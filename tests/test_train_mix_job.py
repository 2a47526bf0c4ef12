"""End-to-end + resume test for jobs/train_mix.py (the CCNet/UniMax
training-mix back half): bucket gate, per-language budgets, epoch
fan-out, deterministic shuffle, packing, checkpointed shards."""

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "jobs"))
import train_mix  # noqa: E402

SF = "/root/testdata/sf0.01"


def test_train_mix_end_to_end_and_resume(spark, tmp_path):
    out = str(tmp_path / "mix")
    # an unrelated cached relation a shared session might hold: the job
    # must release ITS caches via handles, never catalog.clearCache()
    marker = spark.range(5).persist()
    marker.count()
    res = train_mix.run(spark, SF, out, budget=300, epoch_cap=1.5,
                        capacity=64, shards=4)
    assert marker.storageLevel.useMemory  # survived the job's cleanup
    assert res["processed"] and not res["skipped"]

    got = spark.read.parquet(res["data_dir"])
    n = got.count()
    assert n > 0
    # CCNet gate: the tail tercile never reaches the mix
    assert set(r["bucket"] for r in got.select("bucket").distinct().collect()) \
        <= {"head", "middle"}
    # UniMax: realized rows per language never exceed the epoch cap of the
    # KEPT (post-gate) slice — counting all documents would loosen the
    # bound ~1.5x and mask tail leaks — and the total stays near the
    # budget (hash-tail slack)
    from ocgis_spark.operators.text import ccnet_buckets

    docs_df = spark.read.parquet(f"{SF}/documents.parquet")
    kept_per_lang = {
        r["lang"]: r["n"] for r in
        ccnet_buckets(docs_df, cache_scores=False)
        .filter(F.col("bucket") != "tail")
        .groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    per = {r["lang"]: r["n"] for r in
           got.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    for lang, cnt in per.items():
        assert cnt <= int(1.5 * kept_per_lang[lang]) + 1
    assert sum(per.values()) <= 300 + len(per)  # permille-floor slack only
    # every emitted row has a unique sequence id and a bounded pack fill
    assert got.select("seq_id").distinct().count() == n
    fills = got.groupBy("pack_id").agg(
        F.sum("n_tokens").alias("tok"), F.count(F.lit(1)).alias("m")
    ).collect()
    # packs overflow by at most one document (concat-then-chunk rule)
    mx = max(r["tok"] for r in fills)
    per_doc_max = got.agg(F.max("n_tokens")).first()[0]
    assert mx <= 64 + per_doc_max
    # packs are SHARD-ATOMIC: every document of a pack lands in exactly
    # one tile directory (a consumer reads whole packs from one shard)
    assert (
        got.groupBy("pack_id")
        .agg(F.countDistinct("tile_id").alias("nt"))
        .agg(F.max("nt")).first()[0] == 1
    )

    # a rerun with the same output resumes over every committed shard
    res2 = train_mix.run(spark, SF, out, budget=300, epoch_cap=1.5,
                         capacity=64, shards=4)
    assert not res2["processed"]
    assert sorted(res2["skipped"]) == sorted(res["processed"])
    assert spark.read.parquet(res["data_dir"]).count() == n

    # a rerun with DIFFERENT parameters against the same output must fail
    # loudly, not silently serve the stale 300-budget mix
    import pytest

    with pytest.raises(ValueError, match="lineage"):
        train_mix.run(spark, SF, out, budget=600, epoch_cap=1.5,
                      capacity=64, shards=4)
    assert marker.storageLevel.useMemory  # cleanup ran on the raise too
    marker.unpersist()


def test_seq_multiplier_never_collides():
    """seq_id = doc_id*mult + epoch must be injective for every legal
    epoch value: epochs are 1-based, max = floor(cap)+1 (the hash tail),
    so the stride must strictly exceed that — including caps >= 8, where
    the old hardcoded 8 collided (doc d epoch 9 == doc d+1 epoch 1)."""
    for cap in (1.0, 1.5, 2.0, 7.0, 8.0, 9.0, 12.5):
        mult = train_mix._seq_multiplier(cap)
        max_epoch = int(cap) + 1
        assert mult > max_epoch
        # adjacent doc_ids cannot collide at the extreme epochs
        assert 0 * mult + max_epoch < 1 * mult + 1


def test_lineage_prefix_grandfathering(spark, tmp_path):
    """A manifest committed under a bare fingerprint (before parameter
    segments were appended to the lineage) must resume under the
    extended fingerprint with identical inputs — and still reject a
    genuinely different fingerprint or dropped segments."""
    import pytest

    from ocgis_spark.checkpoint import CheckpointManager

    df = spark.range(8).select(
        (F.col("id") % 2).cast("int").alias("tile_id"), F.col("id").alias("v")
    )
    out = str(tmp_path / "cp")
    cp = CheckpointManager(out)
    cp.run_stage(spark, df, lineage="xx64:abc")          # pre-upgrade form
    # extended form over the same inputs: grandfathered, resumes cleanly
    res = CheckpointManager(out).run_stage(
        spark, df, lineage="xx64:abc:budget=300"
    )
    assert not res["processed"] and sorted(res["skipped"]) == [0, 1]
    # different fingerprint: still rejected
    with pytest.raises(ValueError, match="lineage"):
        CheckpointManager(out).run_stage(
            spark, df, lineage="xx64:OTHER:budget=300"
        )
    # dropping segments (current is a prefix of committed) is ambiguous:
    # rejected, not grandfathered
    with pytest.raises(ValueError, match="lineage"):
        CheckpointManager(out).run_stage(spark, df, lineage="xx64:ab")
