"""Span-sequence invariant + checkpoint/resume semantics."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from ocgis_spark import spans as SP
from ocgis_spark.checkpoint import CheckpointManager, lineage_fingerprint
from ocgis_spark.fixtures import DOC_GRID, QUERY_PENTAGON, register_docs_geo
from ocgis_spark.operators import spatial, tiling

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def docs_spans(spark):
    return SP.with_spans(register_docs_geo(spark, SF))


def test_span_preservation_through_pipeline(spark, docs_spans):
    sub = spatial.spatial_subset(
        spark, docs_spans, DOC_GRID, [QUERY_PENTAGON], abstraction="point"
    )
    tiled = tiling.assign_dest_tiles(sub, DOC_GRID, 16)
    n = SP.check_span_preservation(docs_spans, tiled)
    assert n == tiled.count() > 0


def test_span_mutation_detected(spark, docs_spans):
    mutated = docs_spans.withColumn(
        "spans",
        F.expr(
            "transform(spans, s -> named_struct('kind', s.kind, 'text', "
            "concat(s.text, 'X'), 'media_ref', s.media_ref, 'offset', s.offset))"
        ),
    )
    with pytest.raises(AssertionError, match="span-sequence invariant"):
        SP.check_span_preservation(docs_spans, mutated)


def test_span_reorder_detected(spark, docs_spans):
    reordered = docs_spans.withColumn("spans", F.reverse("spans"))
    with pytest.raises(AssertionError):
        SP.check_span_preservation(docs_spans, reordered)


def test_checkpoint_resume(spark, docs_spans, tmp_path):
    """Kill/rerun semantics: first run commits a subset of tiles; the rerun
    processes only the remainder; a third run is a no-op."""
    tiled = tiling.assign_dest_tiles(
        docs_spans.drop("spans"), DOC_GRID, 16
    ).select("doc_uid", "cell_id", "tile_id", "value")
    all_tiles = sorted(r.tile_id for r in tiled.select("tile_id").distinct().collect())
    assert len(all_tiles) > 2

    cp = CheckpointManager(str(tmp_path / "ckpt"))
    lin = lineage_fingerprint(tiled, ["doc_uid"])

    # simulate a run that died after committing only the first 2 tiles
    first_two = tiled.filter(F.col("tile_id").isin(all_tiles[:2]))
    r1 = cp.run_stage(spark, first_two, lineage=lin)
    assert r1["processed"] == all_tiles[:2]

    # resume with the FULL input: only the remaining tiles are processed
    r2 = cp.run_stage(spark, tiled, lineage=lin)
    assert r2["skipped"] == all_tiles[:2]
    assert r2["processed"] == all_tiles[2:]

    # idempotent third run
    r3 = cp.run_stage(spark, tiled, lineage=lin)
    assert r3["processed"] == [] and r3["skipped"] == all_tiles

    # manifest carries metrics + lineage per tile
    recs = cp.records()
    assert {r["tile_id"] for r in recs} == set(all_tiles)
    assert all(r["rows"] > 0 and r["lineage"] == lin for r in recs)

    # data on disk is complete and per-tile partitioned
    back = spark.read.parquet(cp.data_dir)
    assert back.count() == tiled.count()
    dirs = glob.glob(os.path.join(cp.data_dir, "tile_id=*"))
    assert len(dirs) == len(all_tiles)


def test_checkpoint_no_duplicates_after_partial_overlap(spark, docs_spans, tmp_path):
    """Re-presenting already-committed tiles must not duplicate rows."""
    tiled = tiling.assign_dest_tiles(
        docs_spans.drop("spans"), DOC_GRID, 16
    ).select("doc_uid", "tile_id")
    cp = CheckpointManager(str(tmp_path / "ckpt2"))
    cp.run_stage(spark, tiled)
    cp.run_stage(spark, tiled)
    back = spark.read.parquet(cp.data_dir)
    assert back.count() == tiled.count()


def test_checkpoint_one_file_per_tile(spark, docs_spans, tmp_path):
    """The pre-write repartition keeps file counts bounded: each tile dir
    holds O(1) files, not O(tasks)."""
    import glob
    import os

    tiled = tiling.assign_dest_tiles(
        docs_spans.drop("spans").repartition(16), DOC_GRID, 16
    ).select("doc_uid", "tile_id")
    cp = CheckpointManager(str(tmp_path / "ckpt3"))
    cp.run_stage(spark, tiled)
    for d in glob.glob(os.path.join(cp.data_dir, "tile_id=*")):
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        assert len(files) <= 2, (d, files)


def test_parquet_converter_with_meta(spark, docs_spans, tmp_path):
    import json

    from ocgis_spark import conv

    path = str(tmp_path / "out_parquet")
    conv.convert_parquet(docs_spans.drop("spans"), path, {"op": "test"})
    back = spark.read.parquet(path)
    assert back.count() == docs_spans.count()
    meta = json.load(open(path + ".conv_meta.json"))
    assert meta["format"] == "parquet" and meta["operations"]["op"] == "test"
