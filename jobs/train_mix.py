#!/usr/bin/env python
"""spark-submit entry job: the training-mix back half — turn a cleaned
corpus into budgeted, shuffled, packed training shards, resumable from
checkpoint.

    spark-submit --py-files dist/ocgis_spark.zip jobs/train_mix.py \
        --input /root/testdata/sf0.01 --output /tmp/mix_out \
        --budget 600 --epoch-cap 1.5 --capacity 256 --shards 8

Stages (the CCNet/UniMax mixing pipeline, composed from the engine's
operators):
perplexity terciles per language (text.ccnet_buckets — corpus bigram LM
+ ONE bounded histogram pass for both cuts) → keep head+middle (the
CCNet training slice) → UniMax budget waterfilling with epoch fan-out
(sampling.unimax_mixture — per-language doc budget, repeats carry an
``epoch`` column) → deterministic global shuffle
(sampling.shuffle_corpus on the (doc, epoch) sequence key — no
single-partition bottleneck) → fixed-capacity sequence packing
(text.pack_sequences) → deterministic shard assignment → checkpointed
per-shard parquet write with lineage + per-language metrics.

Shuffle budget: the LM/score joins + histogram window (ccnet), the
range-partition of the global shuffle, the pack-bucket window, and the
checkpoint sink's shard repartition; everything else is narrow or
broadcast. Re-running with the same --output resumes from the last
committed shard.
"""

from __future__ import annotations

import argparse
import os
import sys

# under spark-submit --py-files the zip is on the path; for a plain
# `python jobs/train_mix.py` dev run, fall back to the repo root
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def run(
    spark: SparkSession,
    input_dir: str,
    output: str,
    budget: int = 600,
    epoch_cap: float = 1.5,
    capacity: int = 256,
    shards: int = 8,
) -> dict:
    """The job body, spark-session-injected so pytest can drive it
    (tests/test_train_mix_job.py) and resume it without a subprocess."""
    from ocgis_spark.checkpoint import CheckpointManager, lineage_fingerprint
    from ocgis_spark.operators import sampling
    from ocgis_spark.operators.sampling import hash_bucket
    from ocgis_spark.operators.text import ccnet_buckets, pack_sequences

    docs = spark.read.parquet(f"{input_dir}/documents.parquet")

    # CCNet slice: keep the two best perplexity terciles per language
    buckets = ccnet_buckets(docs).filter(F.col("bucket") != "tail")
    kept = docs.join(buckets.select("doc_id", "bucket"), "doc_id")

    # UniMax: per-language budget with epoch repeats
    mixed = sampling.unimax_mixture(
        kept, budget, epoch_cap=epoch_cap, stratum="lang"
    )
    # a (doc, epoch) sequence key: unique per emitted row, deterministic
    # (epoch_cap bounds epochs; 8 leaves headroom for any sane cap)
    mixed = mixed.withColumn(
        "seq_id", (F.col("doc_id") * F.lit(8) + F.col("epoch")).cast("bigint")
    )

    # deterministic global shuffle, then fixed-capacity packing keyed on
    # the shuffled sequence id (pack buckets hash off seq_id, so epoch
    # repeats of a doc land in independent streams)
    shuffled = sampling.shuffle_corpus(mixed, key="seq_id")
    packs = pack_sequences(
        shuffled.select("seq_id", "text"), capacity=capacity,
        order=("seq_id",),
    )
    final = (
        mixed.select("doc_id", "lang", "bucket", "epoch", "seq_id", "text")
        .join(packs.select("seq_id", "n_tokens", "pack_id"), "seq_id")
        .withColumn("tile_id", hash_bucket(F.col("seq_id"), shards).cast("int"))
    )

    cp = CheckpointManager(output)
    lin = lineage_fingerprint(docs.select("doc_id"), ["doc_id"])
    res = cp.run_stage(spark, final, lineage=lin)
    res["manifest_dir"] = cp.manifest_dir
    res["data_dir"] = cp.data_dir
    return res


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="dir with documents.parquet")
    ap.add_argument("--output", required=True, help="checkpoint/output root")
    ap.add_argument("--budget", type=int, default=600,
                    help="total document budget across languages")
    ap.add_argument("--epoch-cap", type=float, default=1.5,
                    help="max epochs of any one language (UniMax cap)")
    ap.add_argument("--capacity", type=int, default=256,
                    help="pack capacity in whitespace tokens")
    ap.add_argument("--shards", type=int, default=8)
    args = ap.parse_args()

    spark = (
        SparkSession.builder.appName("ocgis_spark_train_mix")
        # engine-required semantics (master comes from spark-submit)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    res = run(spark, args.input, args.output, budget=args.budget,
              epoch_cap=args.epoch_cap, capacity=args.capacity,
              shards=args.shards)
    print(
        f"train_mix done: {len(res['processed'])} shards processed, "
        f"{len(res['skipped'])} resumed-over, manifest at {res['manifest_dir']}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
