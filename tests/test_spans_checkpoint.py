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


def test_chunk_spans_reassembly_invariant(spark, docs_spans):
    """Chunking preserves the span sequence exactly: re-concatenating
    every doc's chunks in (chunk_id, pos) order reproduces the original
    span_signature — the north-rule per-row invariant, through the
    context-window splitter."""
    src = docs_spans.select("doc_id", "spans")
    flat = SP.chunk_spans(src, max_tokens=32)
    rebuilt = (
        flat.groupBy("doc_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct(
                    "chunk_id", "pos", "kind",
                    F.col("span_text").alias("text"),
                    "media_ref",
                    F.col("span_offset").alias("offset"),
                ))),
                lambda s: F.struct(
                    s["kind"].alias("kind"), s["text"].alias("text"),
                    s["media_ref"].alias("media_ref"),
                    s["offset"].alias("offset"),
                ),
            ).alias("spans")
        )
    )
    n = SP.check_span_preservation(
        src.selectExpr("concat('doc', CAST(doc_id AS STRING)) AS doc_uid",
                       "spans"),
        rebuilt.selectExpr("concat('doc', CAST(doc_id AS STRING)) AS doc_uid",
                           "spans"),
    )
    assert n == src.count() > 0


def test_chunk_spans_properties(spark, docs_spans):
    """chunk_id is dense from 0 and non-decreasing with pos; a doc whose
    total cost fits max_tokens yields exactly one chunk; the packed form
    agrees with the flat form on chunk token totals."""
    src = docs_spans.select("doc_id", "spans")
    flat = SP.chunk_spans(src, max_tokens=32).toPandas()
    for _, g in flat.groupby("doc_id"):
        g = g.sort_values("pos")
        cid = g["chunk_id"].tolist()
        assert cid[0] == 0
        assert all(b - a in (0, 1) for a, b in zip(cid, cid[1:]))

    # one giant budget -> one chunk per doc
    one = SP.chunk_spans(src, max_tokens=10**6).toPandas()
    assert (one["chunk_id"] == 0).all()

    packed = SP.chunk_spans_packed(src, max_tokens=32).toPandas()
    want = (
        flat.groupby(["doc_id", "chunk_id"])["span_tokens"].sum()
        .reset_index(name="n_tokens")
    )
    got = packed[["doc_id", "chunk_id", "n_tokens"]]
    merged = want.merge(got, on=["doc_id", "chunk_id"],
                        suffixes=("_w", "_g"))
    assert len(merged) == len(want) == len(got)
    assert (merged["n_tokens_w"] == merged["n_tokens_g"]).all()
