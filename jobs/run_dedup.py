#!/usr/bin/env python
"""spark-submit entry job: resumable corpus-scale fuzzy dedup.

    spark-submit --py-files dist/ocgis_spark.zip jobs/run_dedup.py \
        --input /root/testdata/sf0.01 --output /tmp/dedup_out \
        [--threshold 0.5] [--shards 64] [--resume]

Two checkpointed phases (the reference has no text dedup; this is the
training-pipeline family, SURVEY.md §2 "training-pipeline additions",
composed with the reference-shaped resumable-execution machinery,
``ocgis_spark/checkpoint.py`` ⇌ ``/root/reference/src/ocgis/util/
large_array.py:170-218``):

1. **Keep-set build** — MinHash/LSH candidates → exact Jaccard ≥ t →
   connected components (large-star/small-star: log²-round, the
   10^12-doc path) → loser doc_ids, written once to
   ``<output>/losers/`` behind Spark's atomic ``_SUCCESS`` marker. A
   resumed run that finds the marker skips the whole phase — the
   expensive half of the job never re-runs after a mid-write kill.
2. **Filtered write** — surviving docs land per hash-shard through
   ``CheckpointManager.run_stage`` (dynamic partition overwrite +
   manifest rows with per-shard row counts, wall time, and the
   keep-set lineage fingerprint). Killed mid-write, committed shards
   are never rewritten; uncommitted shards are idempotently replaced.

Both phases are pure DataFrame plans (LSH banding bounds candidates —
nothing pairs the corpus; components converge in log² rounds).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="dir with documents.parquet")
    ap.add_argument("--output", required=True, help="checkpoint/output root")
    ap.add_argument("--threshold", type=float, default=0.5)
    ap.add_argument("--shards", type=int, default=64,
                    help="hash shards for the checkpointed write")
    args = ap.parse_args()

    spark = (
        SparkSession.builder.appName("ocgis_spark_dedup")
        # engine-required semantics (master comes from spark-submit)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .getOrCreate()
    )
    from ocgis_spark.checkpoint import CheckpointManager, lineage_fingerprint
    from ocgis_spark.operators import dedup

    docs = spark.read.parquet(os.path.join(args.input, "documents.parquet"))

    losers_dir = os.path.join(args.output, "losers")
    if not os.path.exists(os.path.join(losers_dir, "_SUCCESS")):
        pairs = dedup.minhash_dedup(docs, threshold=args.threshold)
        comp = dedup.duplicate_components_star(pairs)
        losers = comp.filter(F.col("node") != F.col("component")).select(
            F.col("node").alias("doc_id")
        )
        # atomic phase commit: parquet write publishes _SUCCESS last, so a
        # mid-write kill leaves no marker and the phase cleanly re-runs
        losers.write.mode("overwrite").parquet(losers_dir)
        print(f"keep-set phase: wrote losers to {losers_dir}")
    else:
        print(f"keep-set phase: resuming from {losers_dir}")
    losers = spark.read.parquet(losers_dir)

    kept = docs.join(losers, "doc_id", "left_anti").withColumn(
        "shard_id", F.pmod(F.xxhash64("doc_id"), F.lit(args.shards)).cast("int")
    )
    mgr = CheckpointManager(os.path.join(args.output, "dedup"))
    res = mgr.run_stage(
        spark, kept, tile_col="shard_id",
        lineage=lineage_fingerprint(losers, ["doc_id"]),
    )
    print(
        f"write phase: processed={len(res['processed'])} shards, "
        f"skipped(resume)={len(res['skipped'])}; "
        f"manifest rows at {mgr.manifest_dir}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
