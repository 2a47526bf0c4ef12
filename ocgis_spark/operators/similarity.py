"""Similarity search over an embedding column (`array<float>`).

* brute-force cosine top-k: JVM-side higher-order functions
  (`zip_with` + `aggregate`) — no Python in the hot path;
* LSH-bucketed variant (scale path): sign-of-dot-product against P
  deterministic hyperplanes (the first P corpus vectors, so the DuckDB
  oracle can rebuild the exact same planes) → bucket join → exact cosine
  within bucket.

At 100 TB the query side is broadcast; the corpus is scanned once. The
LSH variant turns the all-pairs product into a bucket-equijoin (shuffle on
a short string key, AQE-skew-splittable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    # cast BEFORE multiplying: float*float would round to float32 and break
    # bit-parity with the DuckDB oracle's double arithmetic
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine_expr(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_topk(
    emb: DataFrame, queries: DataFrame, k: int = 5
) -> DataFrame:
    """Exact top-k by cosine for each query vector (queries broadcast).
    Returns (query_id, vec_id, cos, rank); self-matches excluded."""
    q = queries.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    joined = emb.crossJoin(F.broadcast(q)).filter(
        F.col("vec_id") != F.col("query_id")
    )
    scored = joined.select(
        "query_id",
        "vec_id",
        F.round(cosine_expr(F.col("q_emb"), F.col("embedding")), 6).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def embedding_near_dups(
    emb: DataFrame, planes: DataFrame, threshold: float = 0.95,
    bands: int = 1, planes_per_band: int = 4,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-bucketed: vectors sharing
    a hyperplane-sign bucket in ANY band are candidate pairs; exact cosine
    ≥ threshold verifies. Banding (independent plane sets, candidates
    unioned) trades compute for recall exactly like MinHash bands:
    recall ≈ 1 - (1 - r)^bands. The corpus is never all-paired — only
    bucket-equijoined (AQE-splittable shuffle on a short key)."""
    pair_sets = []
    for b_i in range(bands):
        band_planes = planes.filter(
            (F.col("vec_id") >= b_i * planes_per_band)
            & (F.col("vec_id") < (b_i + 1) * planes_per_band)
        )
        b = lsh_buckets(emb, band_planes)
        e = emb.join(b, "vec_id")
        a = e.select(
            F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a"),
            "bucket",
        )
        c = e.select(F.col("vec_id").alias("vec_b"), "bucket")
        pair_sets.append(
            a.join(c, "bucket").filter(F.col("vec_a") < F.col("vec_b"))
            .select("vec_a", "vec_b")
        )
    pairs = pair_sets[0]
    for p in pair_sets[1:]:
        pairs = pairs.unionByName(p)
    pairs = pairs.distinct()
    ea = emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a"))
    eb = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b"))
    scored = pairs.join(ea, "vec_a").join(eb, "vec_b").select(
        "vec_a", "vec_b",
        F.round(cosine_expr(F.col("emb_a"), F.col("emb_b")), 6).alias("cos"),
    )
    return scored.filter(F.col("cos") >= threshold)


def ivf_assign(emb: DataFrame, centroids: DataFrame) -> DataFrame:
    """IVF coarse quantizer: assign every vector to its nearest centroid by
    cosine (ties → smallest centroid id).

    Centroids are collected driver-side (they are always few) and inlined
    as literal arrays, so the assignment is a pure narrow map —
    ``greatest`` over (cos, -cid) structs — with ZERO shuffle of the
    corpus. (The first implementation crossJoined + windowed, which
    shuffled every vector just to pick an argmax.)"""
    cents = sorted(
        ((int(r["vec_id"]), [float(x) for x in r["embedding"]])
         for r in centroids.collect()),
        key=lambda t: t[0],
    )
    structs = []
    for cid, vec in cents:
        lit_vec = F.array(*[F.lit(x) for x in vec])
        cos = F.round(cosine_expr(F.col("embedding"), lit_vec), 6)
        structs.append(F.struct(cos.alias("c"), F.lit(-cid).alias("negid")))
    best = F.greatest(*structs) if len(structs) > 1 else structs[0]
    return emb.select(
        "vec_id", "embedding", (-best["negid"]).cast("int").alias("bucket")
    )


def ivf_topk(
    emb: DataFrame, centroids: DataFrame, queries: DataFrame,
    k: int = 3, nprobe: int = 2,
) -> DataFrame:
    """IVF search: probe the query's ``nprobe`` nearest centroid buckets,
    exact cosine within them. The scale path when hyperplane LSH recall is
    insufficient: corpus scanned once to build lists, queries touch only
    probed lists."""
    lists = ivf_assign(emb, centroids)
    c = centroids.select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("c_emb")
    )
    qprobe = (
        queries.select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
        )
        .crossJoin(F.broadcast(c))
        .select(
            "query_id", "q_emb", "cid",
            F.round(cosine_expr(F.col("q_emb"), F.col("c_emb")), 6).alias("ccos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("ccos"), F.asc("cid"))
    probes = (
        qprobe.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= nprobe)
        .select("query_id", "q_emb", F.col("cid").alias("bucket"))
    )
    cand = probes.join(lists, "bucket").filter(
        F.col("vec_id") != F.col("query_id")
    )
    scored = cand.select(
        "query_id", "vec_id",
        F.round(cosine_expr(F.col("q_emb"), F.col("embedding")), 6).alias("cos"),
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
    )


def lsh_buckets(emb: DataFrame, planes: DataFrame, n_planes: int = 4) -> DataFrame:
    """Bucket id = concatenated signs of dot(v, plane_p) for the P
    deterministic hyperplanes (first P corpus vectors by vec_id)."""
    p = planes.select(
        F.col("vec_id").alias("plane_id"), F.col("embedding").alias("p_emb")
    )
    signed = (
        emb.crossJoin(F.broadcast(p))
        .select(
            "vec_id",
            "plane_id",
            F.when(_dot(F.col("embedding"), F.col("p_emb")) >= 0, F.lit("1"))
            .otherwise(F.lit("0"))
            .alias("bit"),
        )
    )
    return (
        signed.groupBy("vec_id")
        .agg(
            F.concat_ws(
                "", F.transform(F.array_sort(F.collect_list(F.struct("plane_id", "bit"))), lambda s: s["bit"])
            ).alias("bucket")
        )
    )
