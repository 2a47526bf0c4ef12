#!/usr/bin/env python
"""spark-submit entry job: the crawl-side corpus-prep pipeline over an
interleaved document table, resumable from checkpoint.

    spark-submit --py-files dist/ocgis_spark.zip jobs/crawl_prep.py \
        --input /root/testdata/sf0.01 --output /tmp/crawl_out \
        --domain-cap 50 --shards 16

Stages (the FineWeb/C4 front half, composed from the engine's operators):
URL canonicalization (urls.canonicalize — narrow codegen projection) →
URL-level exact dedup (urls.url_dedup, first-crawl-wins) → Gopher
quality gate (text.gopher_rules, inline via ``keep`` — no join back) →
per-registered-domain cap (urls.domain_cap) → interleaved span
construction + span-preserving PII scrub (spans.scrub_spans — media
spans byte-identical) → deterministic shard assignment → checkpointed
per-shard parquet write with lineage + metrics manifest rows.

Shuffle budget: TWO window shuffles (url dedup, domain cap) + the final
shard repartition inside the checkpoint sink; everything else is narrow.
Re-running with the same --output resumes from the last committed shard.
If the input lacks a ``url`` column, a deterministic messy URL is
synthesized from doc_id (urls.url_synth_sql — demo/test mode; production
tables carry their own).
"""

from __future__ import annotations

import argparse
import os
import sys

# under spark-submit --py-files the zip is on the path; for a plain
# `python jobs/crawl_prep.py` dev run, fall back to the repo root
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def run(
    spark: SparkSession,
    input_dir: str,
    output: str,
    domain_cap: int = 50,
    shards: int = 16,
    min_words: int = 5,
) -> dict:
    """The job body, spark-session-injected so pytest can drive it
    (tests/test_crawl_prep_job.py) and resume it without a subprocess."""
    from ocgis_spark import spans as SP
    from ocgis_spark.checkpoint import CheckpointManager, lineage_fingerprint
    from ocgis_spark.operators import urls
    from ocgis_spark.operators.sampling import hash_bucket
    from ocgis_spark.operators.text import gopher_rules

    docs = spark.read.parquet(f"{input_dir}/documents.parquet")
    if "url" not in docs.columns:
        docs = docs.withColumn("url", F.expr(urls.url_synth_sql()))

    deduped = urls.url_dedup(docs.select("doc_id", "text", "url"))
    gated = gopher_rules(
        deduped, keep=("text", "canon_url", "domain"), min_words=min_words
    ).filter(F.col("passes"))
    capped = urls.domain_cap(gated, cap=domain_cap)
    scrubbed = SP.scrub_spans(
        SP.with_spans(capped.select("doc_id", "text", "canon_url", "domain"))
    )
    sharded = scrubbed.withColumn(
        "tile_id", hash_bucket(F.col("doc_id"), shards).cast("int")
    ).select(
        "doc_uid", "canon_url", "domain", "spans",
        SP.span_signature_fast().alias("span_sig"), "tile_id",
    )

    cp = CheckpointManager(output)
    lin = lineage_fingerprint(docs.select("doc_id"), ["doc_id"])
    res = cp.run_stage(spark, sharded, lineage=lin)
    res["manifest_dir"] = cp.manifest_dir
    res["data_dir"] = cp.data_dir
    return res


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="dir with documents.parquet")
    ap.add_argument("--output", required=True, help="checkpoint/output root")
    ap.add_argument("--domain-cap", type=int, default=50)
    ap.add_argument("--shards", type=int, default=16)
    ap.add_argument("--min-words", type=int, default=5,
                    help="gopher word floor (the synthetic fixture docs "
                    "are short; real corpora use the Gopher default 50)")
    args = ap.parse_args()

    spark = (
        SparkSession.builder.appName("ocgis_spark_crawl_prep")
        # engine-required semantics (master comes from spark-submit)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    res = run(spark, args.input, args.output,
              domain_cap=args.domain_cap, shards=args.shards,
              min_words=args.min_words)
    print(
        f"crawl_prep done: {len(res['processed'])} shards processed, "
        f"{len(res['skipped'])} resumed-over, manifest at {res['manifest_dir']}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
