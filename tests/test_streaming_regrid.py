"""Streaming pipeline (stream == batch results) and regrid weight
application goldens."""

import pytest
from pyspark.sql import functions as F

from ocgis_spark.fixtures import DOC_GRID, register_docs_geo
from ocgis_spark.operators import crs, regrid
from ocgis_spark.streaming import pipeline as SPL

SF = "/root/testdata/sf0.001"


def _stage_dir(tmp_path, src_file, name):
    """File-stream sources need a DIRECTORY; stage the parquet into one."""
    import shutil

    d = tmp_path / name
    d.mkdir()
    shutil.copy(src_file, d / "part-000.parquet")
    return str(d)


def test_streaming_span_stats_matches_batch(spark, tmp_path):
    stream = SPL.stream_documents(
        spark, _stage_dir(tmp_path, f"{SF}/documents.parquet", "docs_in")
    )
    assert stream.isStreaming
    agg = SPL.streaming_span_stats(stream)
    SPL.run_available_now(agg, "span_stats_t", str(tmp_path / "ck1"))
    got = {
        r.source: (r.n_docs, r.n_media_spans)
        for r in spark.sql("SELECT * FROM span_stats_t").collect()
    }
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    expected = {
        r.source: (r.n, r.m)
        for r in docs.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"), F.count(F.lit(1)).alias("m"))
        .collect()
    }  # every doc has exactly 1 media span
    assert got == expected


def test_streaming_windowed_counts_matches_batch(spark, tmp_path):
    # events stream: windowed watermarked counts == batch window counts
    ev_path = _stage_dir(tmp_path, "/root/testdata/sf0.001/events.parquet", "ev_in")
    schema = spark.read.parquet(ev_path).schema
    stream = spark.readStream.schema(schema).parquet(ev_path)
    win = SPL.streaming_windowed_counts(stream)
    SPL.run_available_now(win, "win_counts_t", str(tmp_path / "ck2"))
    got = {
        (r.w_start, r.event_type): r.n
        for r in spark.sql("SELECT * FROM win_counts_t").collect()
    }
    batch = (
        spark.read.parquet(ev_path)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy(F.window("ts", "6 hours").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("w_start"), "event_type", "n")
    )
    expected = {(r.w_start, r.event_type): r.n for r in batch.collect()}
    assert got == expected and len(got) > 10


def test_regrid_block_mean_golden(spark):
    """Full 4x4 golden grid coarsened 2x: each dst cell is the mean of its
    quadrant -> dst values equal the quadrant constants, weight_sum 1."""
    rows = []
    for cy in range(4):
        for cx in range(4):
            north, east = cy >= 2, cx >= 2
            val = 1.0 if (north and not east) else 2.0 if north else 3.0 if not east else 4.0
            rows.append((cy * 4 + cx, val))
    src = spark.createDataFrame(rows, "src_id bigint, value double")
    from ocgis_spark.geo.cellindex import GridSpec

    g = GridSpec(nx=4, ny=4)
    w = regrid.conservative_weights(spark, g, factor=2)
    out = {r.dst_id: (r.dst_value, r.weight_sum)
           for r in regrid.apply_weights(src, w).collect()}
    assert out == {
        0: (3.0, 1.0), 1: (4.0, 1.0), 2: (1.0, 1.0), 3: (2.0, 1.0)
    }


def test_regrid_partial_coverage(spark):
    """Missing source cells surface as weight_sum < 1 (masked-cell
    normalization hook)."""
    src = spark.createDataFrame([(0, 2.0), (1, 4.0)], "src_id bigint, value double")
    from ocgis_spark.geo.cellindex import GridSpec

    w = regrid.conservative_weights(spark, GridSpec(nx=4, ny=4), factor=2)
    out = {r.dst_id: (r.dst_value, r.weight_sum)
           for r in regrid.apply_weights(src, w).collect()}
    assert out[0] == (pytest.approx(1.5), pytest.approx(0.5))


def test_wrap_state_detection(spark):
    dg = register_docs_geo(spark, SF)
    assert crs.is_wrapped_state(dg) == "wrapped"
    unwrapped = dg.withColumn("lon", crs.unwrap_lon("lon"))
    assert crs.is_wrapped_state(unwrapped) == "unwrapped"


def test_spherical_to_cartesian(spark):
    df = spark.createDataFrame([(0.0, 0.0), (90.0, 0.0), (0.0, 90.0)],
                               "lon double, lat double")
    out = crs.spherical_to_cartesian(df).collect()
    assert out[0].cart_x == pytest.approx(1.0)
    assert out[1].cart_y == pytest.approx(1.0)
    assert out[2].cart_z == pytest.approx(1.0)


def test_streaming_spatial_subset_same_operator(spark, tmp_path):
    """The SAME spatial_subset operator runs unchanged on a STREAM: the
    two-phase subset is stateless (bbox/half-plane predicates + broadcast
    covering), so continuous ingest gets the identical plan. Stream results
    == batch results."""
    from ocgis_spark.fixtures import (
        DOC_GRID, QUERY_PENTAGON, docs_geo_sql, register_docs_geo,
    )
    from ocgis_spark.operators import spatial, tiling

    src = _stage_dir(tmp_path, "/root/testdata/sf0.001/documents.parquet",
                     "docs_geo_in")
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    stream.createOrReplaceTempView("documents_stream")
    dg_stream = spark.sql(docs_geo_sql(table="documents_stream"))
    assert dg_stream.isStreaming

    sub = spatial.spatial_subset(
        spark, dg_stream, DOC_GRID, [QUERY_PENTAGON], abstraction="point"
    )
    tiled = tiling.assign_dest_tiles(sub, DOC_GRID, 16)
    agg = tiled.groupBy("tile_id").count()
    q = (
        agg.writeStream.format("memory").queryName("stream_subset_t")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck3"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = {r.tile_id: r["count"] for r in
           spark.sql("SELECT * FROM stream_subset_t").collect()}

    dg_batch = register_docs_geo(spark, "/root/testdata/sf0.001")
    sub_b = spatial.spatial_subset(
        spark, dg_batch, DOC_GRID, [QUERY_PENTAGON], abstraction="point"
    )
    expected = {r.tile_id: r["count"] for r in
                tiling.assign_dest_tiles(sub_b, DOC_GRID, 16)
                .groupBy("tile_id").count().collect()}
    assert got == expected and sum(got.values()) > 0


def test_streaming_pii_scrub_matches_batch(spark, tmp_path):
    """pii_scan is a narrow map, so the SAME operator runs unchanged on a
    stream (corpus scrubbing as a continuous ingest stage); availableNow
    result == batch result row for row."""
    from ocgis_spark.operators import text as textops

    stream = SPL.stream_documents(
        spark, _stage_dir(tmp_path, f"{SF}/documents.parquet", "pii_in")
    )
    scrubbed = textops.pii_scan(stream)
    assert scrubbed.isStreaming
    SPL.run_available_now(scrubbed, "pii_t", str(tmp_path / "ck_pii"),
                          output_mode="append")
    got = {r.doc_id: (r.n_emails, r.n_ssns, r.n_phones, r.redacted)
           for r in spark.sql("SELECT * FROM pii_t").collect()}
    batch = {r.doc_id: (r.n_emails, r.n_ssns, r.n_phones, r.redacted)
             for r in textops.pii_scan(
                 spark.read.parquet(f"{SF}/documents.parquet")).collect()}
    assert got == batch and len(got) > 0
