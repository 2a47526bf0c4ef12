"""Crawl-prep composition job (jobs/crawl_prep.py): URL canon → dedup →
gopher gate → domain cap → span scrub → checkpointed sharded write, with
resume-from-manifest semantics."""

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "jobs")
)

import crawl_prep  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_crawl_prep_end_to_end_and_resume(spark, tmp_path):
    out = str(tmp_path / "crawl")
    res = crawl_prep.run(spark, SF, out, domain_cap=5, shards=4, min_words=2)
    assert res["processed"] and not res["skipped"]

    got = spark.read.parquet(res["data_dir"])
    assert set(got.columns) >= {
        "doc_uid", "canon_url", "domain", "spans", "span_sig", "tile_id"
    }
    n = got.count()
    assert n > 0
    # domain cap honored
    per = got.groupBy("domain").count().collect()
    assert all(r["count"] <= 5 for r in per)
    # url dedup: canonical urls unique
    assert got.select("canon_url").distinct().count() == n
    # spans survived the scrub with the interleaved shape intact
    k = got.select(F.expr("transform(spans, s -> s.kind)").alias("ks")).first()["ks"]
    assert k[0] == "text" and k[1] in ("image", "audio") and k[2] == "text"

    # a rerun with the same output resumes over every committed shard
    res2 = crawl_prep.run(spark, SF, out, domain_cap=5, shards=4, min_words=2)
    assert not res2["processed"]
    assert sorted(res2["skipped"]) == sorted(res["processed"])
    assert spark.read.parquet(res["data_dir"]).count() == n
