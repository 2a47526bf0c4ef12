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
``epoch`` column) → fixed-capacity sequence packing in deterministic
pseudo-random order (text.pack_sequences ordered by
sampling.shuffle_key — the pack window IS the global shuffle: packs
fill in hash order, so consecutive documents in a pack are
decorrelated, with no extra range exchange) → pack-atomic shard
assignment (every document of a pack lands in ONE shard) →
checkpointed per-shard parquet write with lineage + per-language
metrics.

Shuffle budget: the LM/score joins + histogram window (ccnet), the
pack-bucket window (doubling as the shuffle pass), and the checkpoint
sink's shard repartition; everything else is narrow or broadcast.
Re-running with the same --output and the same parameters resumes from
the last committed shard; changed inputs OR parameters fail loudly
(the lineage fingerprint covers both).
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


def _seq_multiplier(epoch_cap: float) -> int:
    """Collision-free seq_id stride for ``doc_id * mult + epoch``: epochs
    are 1-based and the hash tail is epoch ``floor(cap) + 1`` at most
    (unimax_mixture emits ``alloc // n <= floor(cap)`` full epochs), so
    ``floor(cap) + 2`` strictly exceeds every epoch value."""
    return int(epoch_cap) + 2


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
    from ocgis_spark.operators.sampling import hash_bucket, shuffle_key
    from ocgis_spark.operators.text import ccnet_buckets, pack_sequences

    docs = spark.read.parquet(f"{input_dir}/documents.parquet")

    # CCNet slice: keep the two best perplexity terciles per language.
    # The registry collects handles to the relations ccnet persists so we
    # can release EXACTLY those later — clearCache() would also evict any
    # unrelated cached work a shared session holds (r4s13 review finding)
    ccnet_caches: list = []
    buckets = ccnet_buckets(docs, cache_registry=ccnet_caches).filter(
        F.col("bucket") != "tail"
    )
    kept = docs.join(buckets.select("doc_id", "bucket"), "doc_id")

    # UniMax: per-language budget with epoch repeats
    mixed = sampling.unimax_mixture(
        kept, budget, epoch_cap=epoch_cap, stratum="lang"
    )
    # a (doc, epoch) sequence key: unique per emitted row, deterministic
    mult = _seq_multiplier(epoch_cap)
    mixed = mixed.withColumn(
        "seq_id",
        (F.col("doc_id") * F.lit(mult) + F.col("epoch")).cast("bigint"),
    ).withColumn("shuf_key", shuffle_key(F.col("seq_id")))

    # The mix is budget-bounded (not corpus-bounded): persist + count()
    # materializes it once (while ccnet's caches are still live) so the
    # ccnet gate + unimax fan-out runs exactly once more after unimax's
    # stratum-count collect, then release exactly ccnet's cached scored/
    # LM relations. persist (not localCheckpoint): cached blocks lost to
    # executor preemption on a real cluster RECOMPUTE from lineage,
    # whereas localCheckpoint blocks are unreplicated and truncate the
    # lineage — losing one aborts the job (r4s13 review finding).
    mixed = mixed.persist()
    try:
        mixed.count()
        for h in ccnet_caches:
            h.unpersist()

        # fixed-capacity packing in shuffle_key order — the pack window
        # IS the global shuffle: buckets hash off shuf_key and fill in
        # (shuf_key, seq_id) order, so epoch repeats of a doc land in
        # independent streams and neighbors within a pack are
        # decorrelated
        packs = pack_sequences(
            mixed.select("shuf_key", "seq_id", "text"), capacity=capacity,
            order=("shuf_key", "seq_id"),
        )
        final = (
            mixed.select("doc_id", "lang", "bucket", "epoch", "seq_id",
                         "text")
            .join(packs.select("seq_id", "n_tokens", "pack_id"), "seq_id")
            # shard off the PACK key: a pack is the atomic training
            # sequence, so all of its documents must land in one shard
            # directory
            .withColumn(
                "tile_id", hash_bucket(F.col("pack_id"), shards).cast("int")
            )
        )

        cp = CheckpointManager(output)
        # the fingerprint covers the input docs AND every parameter that
        # determines the output, so a rerun with a different budget/cap/
        # capacity/shards against the same --output fails loudly instead
        # of silently serving the stale mix
        lin = (
            lineage_fingerprint(docs.select("doc_id"), ["doc_id"])
            + f":budget={budget}:epoch_cap={epoch_cap}"
            + f":capacity={capacity}:shards={shards}"
        )
        res = cp.run_stage(spark, final, lineage=lin)
    finally:
        # release this job's caches even when the lineage guard raises —
        # a second unpersist of an already-released handle is a no-op
        mixed.unpersist()
        for h in ccnet_caches:
            h.unpersist()
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
