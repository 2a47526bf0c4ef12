"""Streaming variants of the core pipeline.

* ``stream_documents`` — file-source stream over a parquet directory (new
  files = new micro-batches; ``Trigger.AvailableNow`` drains everything
  present, which is how the tests compare stream vs batch results);
* ``streaming_span_stats`` — the interleaved-span construction + per-source
  aggregation as an incremental query;
* ``streaming_windowed_counts`` — event-time tumbling windows with a
  watermark for late data (the canonical Structured Streaming shape).

All transformations are the SAME DataFrame functions the batch engine uses
— Structured Streaming runs the identical logical plan incrementally, so
there is no second implementation to keep in sync.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import spans as SP


def stream_documents(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream of documents (``path`` must be a DIRECTORY —
    Spark's file stream source watches directories; schema pinned from a
    batch peek because streaming sources require an explicit schema)."""
    schema = spark.read.parquet(path).schema
    return spark.readStream.schema(schema).parquet(path)


def streaming_span_stats(docs_stream: DataFrame) -> DataFrame:
    """Per-source doc counts + media-span counts over the stream."""
    with_s = SP.with_spans(docs_stream)
    return (
        with_s.select(
            "source",
            F.size(F.filter("spans", lambda s: s["kind"] != "text")).alias("n_media"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_media").alias("n_media_spans"),
        )
    )


def streaming_windowed_counts(
    events_stream: DataFrame, window: str = "6 hours", watermark: str = "1 hour"
) -> DataFrame:
    """Watermarked tumbling-window counts per event type."""
    return (
        events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.avg("value"), 6).alias("mean_value"))
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "event_type", "n", "mean_value",
        )
    )


def run_available_now(
    df: DataFrame,
    query_name: str,
    checkpoint_dir: str,
    output_mode: str = "complete",
):
    """Drain all currently-available input into an in-memory sink and stop.
    Returns the finished StreamingQuery (results at table ``query_name``).
    ``output_mode``: 'complete' for aggregations (default), 'append' for
    stateless maps/filters (Spark rejects complete without aggregation)."""
    q = (
        df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def streaming_hll_sketch(
    docs_stream: DataFrame, keys: list[str], value: str
) -> DataFrame:
    """HLL register table maintained over a STREAM: the (key, bucket) max
    aggregation is an incremental-friendly stateful agg (max is monotone,
    so complete-mode state = exactly the register table, bounded at
    m rows per key regardless of stream length). Registers equal the
    batch sketch over the same data — asserted stream==batch in pytest;
    estimate with `operators.sketch.hll_estimate` on the drained table."""
    from ocgis_spark.operators import sketch as SK

    b, r = SK.sketch_sql(value)
    reg = docs_stream.selectExpr(*keys, f"{b} AS bucket", f"{r} AS rho")
    return reg.groupBy(*keys, "bucket").agg(F.max("rho").alias("rho"))


def streaming_cms_sketch(
    docs_stream: DataFrame, keys: list[str], value: str,
    weight: str | None = None,
) -> DataFrame:
    """Count-min counter table maintained over a STREAM: the
    (key, r, bucket) SUM aggregation is incremental-friendly (sum is
    associative and commutative), so complete-mode state = exactly the
    counter table, bounded at DEPTH*WIDTH rows per key regardless of
    stream length. Counters equal the batch sketch over the same data —
    asserted stream==batch in pytest; estimate with
    `operators.sketch.cms_estimate` on the drained table. Together with
    `streaming_hll_sketch` this gives the streaming half of the mergeable-
    sketch pair: distinct counts (max-merge) and frequencies (sum-merge)."""
    from ocgis_spark.operators import sketch as SK

    w = weight if weight else "1"
    buckets = ", ".join(
        SK.cms_bucket_sql(value, r) for r in range(SK.CMS_DEPTH)
    )
    rows = docs_stream.selectExpr(
        *keys,
        f"posexplode(array({buckets})) AS (r, bucket)",
        f"CAST({w} AS BIGINT) AS w",
    )
    return rows.groupBy(*keys, "r", "bucket").agg(F.sum("w").alias("cnt"))


def streaming_bloom_sketch(docs_stream: DataFrame, value: str) -> DataFrame:
    """Bloom position table maintained over a STREAM: each row lights
    BLOOM_K positions (narrow explode) and the distinct-position state is
    a count agg on ``pos`` — bounded at BLOOM_BITS rows TOTAL regardless
    of stream length (the smallest complete-mode state of the three
    sketches; HLL is m rows per key, CMS depth*width per key). Positions
    equal the batch sketch over the same data — asserted stream==batch in
    pytest; screen new batches with ``operators.sketch.bloom_probe``
    against the drained table (the exact-membership half of the ingest
    screen; ``streaming_near_dup_hits`` above is the near-dup half)."""
    from ocgis_spark.operators import sketch as SK

    positions = ", ".join(
        SK.bloom_position_sql(value, r) for r in range(SK.BLOOM_K)
    )
    ex = docs_stream.selectExpr(f"explode(array({positions})) AS pos")
    return ex.groupBy("pos").agg(F.count(F.lit(1)).alias("_n")).select("pos")


def streaming_dedup(
    docs_stream: DataFrame, key_expr: str = "lower(trim(substr(text, 1, 40)))"
) -> DataFrame:
    """Exact dedup on a document STREAM: normalized-key `dropDuplicates`
    (stateful across micro-batches) — the streaming form of
    ``operators.dedup.exact_dups``'s keep-first semantics. State holds one
    row per distinct key; at scale, bound it with a watermark on an event-
    time column (``dropDuplicatesWithinWatermark``) — unbounded here
    because the batch operator is also corpus-global."""
    keyed = docs_stream.withColumn("_dk", F.expr(key_expr))
    return keyed.dropDuplicates(["_dk"]).drop("_dk")


def streaming_near_dup_hits(
    docs_stream: DataFrame, index: DataFrame
) -> DataFrame:
    """Ingest-time near-dup screen over a STREAM: each micro-batch's
    documents are minhash-banded (narrow map) and stream-static LEFT
    SEMI joined against the historical ``lsh_band_index`` bucket table —
    stateless per batch except the emitted-id dedup (state = hit ids;
    see ``operators.dedup.near_dup_hits``). Hits equal the batch screen
    over the same files — asserted stream==batch in pytest."""
    from ocgis_spark.operators import dedup as D

    return D.near_dup_hits(docs_stream, index)


def streaming_sessionize(
    events_stream: DataFrame,
    gap_s: int = 1800,
    state_timeout_min: int = 120,
) -> DataFrame:
    """Per-EVENT session labeling over a stream — the custom stateful
    operator built-in session_window cannot express (session_window
    aggregates per session; training pipelines need the label ON each
    event row). ``applyInPandasWithState`` keeps (last_epoch,
    session_id) per user; a gap > ``gap_s`` starts a new session,
    matching the batch lag/cumsum sessionizer exactly (same (ts,
    event_id) order, same strict-> comparison, sessions numbered from
    1). Idle users' state expires after ``state_timeout_min`` of
    processing time — state is O(active users), not O(events).

    Assumes per-user event-time order ACROSS micro-batches (bound late
    arrivals upstream with a watermark + sort, or accept that a
    reordered event may split a session — the same contract every
    incremental sessionizer carries)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        IntegerType, LongType, StructField, StructType,
    )

    out_schema = StructType([
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("session_id", IntegerType()),
    ])
    state_schema = StructType([
        StructField("last_epoch", LongType()),
        StructField("sid", IntegerType()),
    ])

    def label(key, pdfs, state: GroupState):
        import pandas as pd

        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            last_epoch, sid = state.get
        else:
            last_epoch, sid = None, 0
        out_uid, out_eid, out_sid = [], [], []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            epochs = (pdf["ts"].astype("int64") // 1_000_000_000).tolist()
            for eid, epoch in zip(pdf["event_id"].tolist(), epochs):
                if last_epoch is None or epoch - last_epoch > gap_s:
                    sid += 1
                last_epoch = epoch
                out_uid.append(key[0])
                out_eid.append(eid)
                out_sid.append(sid)
        state.update((last_epoch, sid))
        state.setTimeoutDuration(state_timeout_min * 60 * 1000)
        yield pd.DataFrame(
            {"user_id": out_uid, "event_id": out_eid, "session_id": out_sid}
        )

    return events_stream.groupBy("user_id").applyInPandasWithState(
        label, out_schema, state_schema, "append",
        GroupStateTimeout.ProcessingTimeTimeout,
    )


def streaming_cell_hotspots(
    events_stream: DataFrame,
    cell_deg: float,
    window: str = "6 hours",
    watermark: str = "1 hour",
    min_count: int = 1,
    ts: str = "ts",
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Watermarked tumbling-window event counts per graticule cell —
    the streaming hotspot/alert feed (the live front of the batch
    Gi*/KDE/Mann-Kendall lattice family; at 100 TB/day this is the
    operator that pages someone). State is bounded by active cells x
    open windows; the watermark closes windows so state cannot grow
    with stream length. ``min_count`` filters to alert-worthy cells.
    Same cell arithmetic as the batch family (`cluster.cell_id_sql`),
    so stream == batch group-by on identical input (pytest-gated).
    """
    from ..operators.cluster import cell_id_sql

    _, cx, cy = cell_id_sql(cell_deg, lon, lat)
    return (
        events_stream.withColumn("_ts", F.col(ts).cast("timestamp"))
        .withWatermark("_ts", watermark)
        .selectExpr("_ts", f"{cx} AS cell_x", f"{cy} AS cell_y")
        .groupBy(F.window("_ts", window).alias("w"), "cell_x", "cell_y")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .filter(F.col("n") >= int(min_count))
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "cell_x", "cell_y", "n",
        )
    )


def streaming_benford(events_stream: DataFrame, value: str) -> DataFrame:
    """Benford digit-count state maintained over a STREAM: the (d, c)
    count aggregation is sum-monotone, so complete-mode state is
    exactly the batch digit-count table (<= 10 rows regardless of
    stream length — the cheapest possible drift monitor for a numeric
    feed). Finalize the drained state with
    `operators.text.benford_finalize`; equals the batch screen over
    the same data — asserted stream==batch in pytest."""
    from ocgis_spark.operators import text as TX

    return (
        events_stream.selectExpr(f"{TX.benford_digit_sql(value)} AS d")
        .groupBy("d")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
