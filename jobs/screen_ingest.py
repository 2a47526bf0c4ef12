#!/usr/bin/env python
"""spark-submit entry job: ingest-time near-duplicate screening of a new
document batch against the historical corpus's LSH band index.

    # one-time (or nightly) index build over the historical corpus:
    spark-submit jobs/screen_ingest.py build-index \
        --corpus /root/testdata/sf0.01 --index /tmp/lsh_index \
        --buckets 64

    # per-ingest screen of a new batch (batch mode):
    spark-submit jobs/screen_ingest.py screen \
        --index /tmp/lsh_index --new /path/to/new_docs --out /tmp/hits

    # continuous screen of a landing directory (streaming mode):
    spark-submit jobs/screen_ingest.py stream \
        --index /tmp/lsh_index --new /path/to/landing \
        --out /tmp/hits_stream --checkpoint /tmp/ckpt

At 100 TB the index is the distinct (band, band_key) bucket table
written BUCKETED by its join key (`bucketBy` + saveAsTable or, here,
repartition-by-key parquet) so every probe join co-locates without
re-shuffling the index; the probe side is a pure narrow map over the
new batch (`ocgis_spark.operators.dedup.lsh_band_index` /
`near_dup_hits`). Nothing ever pairs documents; per-batch cost is
O(|new batch|) + one hash join against the index partitions the new
band keys actually touch."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def _session(app: str) -> SparkSession:
    return (
        SparkSession.builder.appName(app)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .getOrCreate()
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["build-index", "screen", "stream"])
    ap.add_argument("--corpus", help="dir with documents.parquet (build-index)")
    ap.add_argument("--index", required=True, help="band-index parquet path")
    ap.add_argument("--new", help="new-docs parquet path/dir (screen/stream)")
    ap.add_argument("--out", help="hit-ids output path (screen/stream)")
    ap.add_argument("--checkpoint", help="stream checkpoint dir (stream)")
    ap.add_argument("--buckets", type=int, default=64,
                    help="index output files, keyed by (band, band_key)")
    args = ap.parse_args()

    # fail at the CLI, not deep inside a running session
    need = {"build-index": ["corpus"], "screen": ["new", "out"],
            "stream": ["new", "out", "checkpoint"]}[args.mode]
    missing = [k for k in need if getattr(args, k) is None]
    if missing:
        ap.error(f"mode {args.mode!r} requires " +
                 ", ".join(f"--{m}" for m in missing))

    from ocgis_spark.operators import dedup

    if args.mode == "build-index":
        spark = _session("ocgis_spark_lsh_index_build")
        docs = spark.read.parquet(
            os.path.join(args.corpus, "documents.parquet")
        ).selectExpr("doc_id", "lower(trim(text)) AS text")
        idx = dedup.lsh_band_index(docs)
        # key-partitioned files: probe joins shuffle only the (small)
        # probe side; swap for bucketBy+saveAsTable where a metastore
        # is available
        (idx.repartition(args.buckets, "band", "band_key")
            .write.mode("overwrite").parquet(args.index))
        print(f"wrote LSH band index: {args.index} ({args.buckets} files)")
        return

    if args.mode == "screen":
        spark = _session("ocgis_spark_ingest_screen")
        idx = spark.read.parquet(args.index)
        new = spark.read.parquet(args.new).selectExpr(
            "doc_id", "lower(trim(text)) AS text"
        )
        hits = dedup.near_dup_hits(new, idx)
        hits.write.mode("overwrite").parquet(args.out)
        n = spark.read.parquet(args.out).count()
        print(f"screened batch: {n} near-dup hits -> {args.out}")
        return

    # stream: continuous screen over a landing directory
    spark = _session("ocgis_spark_ingest_screen_stream")
    from ocgis_spark.streaming import pipeline as P

    idx = spark.read.parquet(args.index)
    schema = spark.read.parquet(args.new).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 8).parquet(args.new)
    ).selectExpr("doc_id", "lower(trim(text)) AS text")
    hits = P.streaming_near_dup_hits(stream, idx)
    q = (
        hits.writeStream.format("parquet")
        .option("path", args.out)
        .option("checkpointLocation", args.checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    print(f"stream screen drained -> {args.out}")


if __name__ == "__main__":
    main()
