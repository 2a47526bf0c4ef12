#!/usr/bin/env python
"""spark-submit entry job: build the ANN serving artifacts for an
embedding corpus — IVF coarse-quantizer centroids + per-vector list
assignment, and PQ codebooks + per-vector codes — then (optionally)
probe the index with a query batch.

    spark-submit --py-files dist/ocgis_spark.zip jobs/ann_build.py \
        --input /root/testdata/sf0.01 --output /tmp/ann \
        --ivf-k 8 --pq-m 4 --pq-k 16 [--probe 100,101,102 --topk 3]

At 100 TB the two halves split the problem: IVF bounds WHICH vectors a
query touches (probed lists only — `similarity.ivf_assign` is a narrow
Arrow argmax, corpus never shuffled), PQ bounds WHAT is stored/scanned
per vector (M integer codes + a broadcast (M x K) LUT instead of the
raw embedding — `similarity.pq_encode` is one narrow Arrow map). Both
trainings run on the same deterministic hash-ordered sample (bounded
driver-side work, the FAISS build convention), so a killed build rerun
produces identical artifacts. Outputs are plain parquet tables
(`centroids/`, `codebooks/`, and the serving table `index/` =
(vec_id, bucket, codes) from ONE narrow pass) + a conv_meta lineage
record; `--probe` demonstrates the two-stage search (`ann_search`)
against the artifacts read back from disk.
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
    ap.add_argument("--input", required=True, help="dir with embeddings.parquet")
    ap.add_argument("--output", required=True, help="index output dir")
    ap.add_argument("--ivf-k", type=int, default=8)
    ap.add_argument("--pq-m", type=int, default=4)
    ap.add_argument("--pq-k", type=int, default=16)
    ap.add_argument("--sample", type=int, default=10_000)
    ap.add_argument("--probe", default=None,
                    help="comma-separated query vec_ids to search after the build")
    ap.add_argument("--topk", type=int, default=3)
    args = ap.parse_args()

    spark = (
        SparkSession.builder.appName("ocgis_spark_ann_build")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )

    from ocgis_spark import conv
    from ocgis_spark.operators import similarity as S

    emb = spark.read.parquet(os.path.join(args.input, "embeddings.parquet")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )

    cents = S.ivf_train(emb, k=args.ivf_k, max_sample=args.sample)
    cents.write.mode("overwrite").parquet(os.path.join(args.output, "centroids"))
    cb = S.pq_train(emb, m=args.pq_m, k=args.pq_k, max_sample=args.sample)
    cb.write.mode("overwrite").parquet(os.path.join(args.output, "codebooks"))

    # the serving table: (vec_id, bucket, codes) from ONE narrow pass —
    # searches prune lists by broadcast-joining on bucket and score from
    # codes; the raw corpus is never re-encoded per query batch
    idx = S.pq_index(emb, cents, cb)
    idx.write.mode("overwrite").parquet(os.path.join(args.output, "index"))

    conv.convert_meta_only(
        idx, os.path.join(args.output, "index"),
        ops_doc={"job": "ann_build", "ivf_k": args.ivf_k,
                 "pq_m": args.pq_m, "pq_k": args.pq_k,
                 "input": args.input},
    )
    n = emb.count()
    print(f"ann index built: {n} vectors, {args.ivf_k} IVF lists, "
          f"PQ {args.pq_m}x{args.pq_k} -> {args.output}")

    if args.probe:
        ids = [int(v) for v in args.probe.split(",")]
        queries = emb.filter(F.col("vec_id").isin(ids))
        # search the WRITTEN artifacts (read back), not the in-memory
        # frames — proves the persisted index serves queries
        cents_r = spark.read.parquet(os.path.join(args.output, "centroids"))
        cb_r = spark.read.parquet(os.path.join(args.output, "codebooks"))
        idx_r = spark.read.parquet(os.path.join(args.output, "index"))
        hits = S.ann_search(
            emb, cents_r, cb_r, queries, k=args.topk, nprobe=2,
            index=idx_r,
        ).orderBy("query_id", "rank")
        for r in hits.collect():
            print(f"  q={r['query_id']} -> vec {r['vec_id']} "
                  f"(cos {r['cos']}, rank {r['rank']})")

    spark.stop()


if __name__ == "__main__":
    main()
