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

import numpy as np
import pandas as pd
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
    Returns (query_id, vec_id, cos, rank); self-matches excluded.

    The broadcast cross-score is a |queries|× row expander over the
    corpus, so an under-split scan (one local parquet file) would run
    the whole cosine stage on ONE core — rebalance the corpus side up to
    the session parallelism first (a no-op on real multi-split inputs;
    profiled r4: the suite's similarity_topk stage was 1 task / 32
    idle cores, the actual cause of the r2→r3 'regression')."""
    sc = emb.sparkSession.sparkContext
    if emb.rdd.getNumPartitions() < sc.defaultParallelism:
        emb = emb.repartition(sc.defaultParallelism)
    # hoist the norms to per-ROW columns before the expander join: array
    # HOFs run interpreted (no codegen), so norm-per-PAIR would pay
    # 2·|queries| redundant 64-element aggregates per corpus row — the
    # hoisted form computes each norm once and reuses the scalar (same
    # expression, same evaluation order: bit-identical to the oracle)
    q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        _norm(F.col("embedding")).alias("q_nrm"),
    )
    emb_n = emb.select(
        "vec_id", "embedding", _norm(F.col("embedding")).alias("e_nrm")
    )
    joined = emb_n.crossJoin(F.broadcast(q)).filter(
        F.col("vec_id") != F.col("query_id")
    )
    scored = joined.select(
        "query_id",
        "vec_id",
        F.round(
            _dot(F.col("q_emb"), F.col("embedding"))
            / (F.col("q_nrm") * F.col("e_nrm")),
            6,
        ).alias("cos"),
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
    all_planes = _collect_planes(planes)
    pair_sets = []
    for b_i in range(bands):
        band_vecs = all_planes[b_i * planes_per_band:(b_i + 1) * planes_per_band]
        # bucket attached as a narrow expression — no corpus self-join
        e = emb.withColumn("bucket", bucket_expr(band_vecs))
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


def _round_half_up(x: np.ndarray, ndigits: int = 6) -> np.ndarray:
    """HALF_UP (away from zero) rounding — matches Spark's ``round`` and
    DuckDB's ``round`` (np.round is banker's rounding and would diverge on
    exact midpoints)."""
    scale = 10.0 ** ndigits
    return np.sign(x) * np.floor(np.abs(x) * scale + 0.5) / scale


def ivf_assign(emb: DataFrame, centroids: DataFrame) -> DataFrame:
    """IVF coarse quantizer: assign every vector to its nearest centroid by
    cosine (ties → smallest centroid id).

    Centroids are collected driver-side (they are always few relative to
    the corpus) into ONE dense matrix captured by an Arrow pandas UDF; the
    assignment is a single ``argmax(emb @ C.T / norms)`` per Arrow batch —
    a pure narrow map with ZERO shuffle of the corpus, and O(1) plan size
    regardless of centroid count. (Two earlier designs failed at scale: a
    crossJoin+window shuffled the whole corpus; inlining each centroid as
    array literals inside ``greatest()`` made the Catalyst plan itself
    O(K·D) — ~3M expression nodes at a realistic 4k×768 IVF.)

    Ties break to the smallest centroid id (reference argmin-order rule):
    centroid rows are sorted by id and ``np.argmax`` returns the first
    maximum."""
    cents = sorted(
        ((int(r["vec_id"]), [float(x) for x in r["embedding"]])
         for r in centroids.collect()),
        key=lambda t: t[0],
    )
    cids = np.array([c for c, _ in cents], dtype="i4")
    C = np.array([v for _, v in cents], dtype="f8")  # (K, D)
    cnorm = np.sqrt((C * C).sum(axis=1))

    @F.pandas_udf("int")
    def nearest_cid(emb_s: pd.Series) -> pd.Series:
        M = np.array(emb_s.tolist(), dtype="f8")  # (B, D)
        norms = np.sqrt((M * M).sum(axis=1))
        norms[norms == 0.0] = 1.0
        # dot / (|v|*|c|), rounded HALF_UP at 6 — the oracle's expression
        cos = _round_half_up(M @ C.T / (norms[:, None] * cnorm[None, :]), 6)
        return pd.Series(cids[np.argmax(cos, axis=1)])

    return emb.select(
        "vec_id", "embedding", nearest_cid(F.col("embedding")).alias("bucket")
    )


def embedding_near_dups_ivf(
    emb: DataFrame, centroids: DataFrame, threshold: float = 0.95
) -> DataFrame:
    """Embedding near-duplicate pairs bucketed by the IVF coarse quantizer
    (the second bucketing scheme beside hyperplane LSH): candidates only
    from equal nearest-centroid buckets, exact cosine verifies. Misses
    pairs straddling a centroid boundary (recall/cost knob: more centroids
    → fewer candidates, lower recall — same trade as nprobe).

    The bucket-assignment relation stays persisted while the returned
    (lazy) plan is alive — both sides of the self-join read it. In a
    long-lived session, release it after consuming the result:
    ``spark.catalog.clearCache()`` or unpersist your own
    ``ivf_assign(...).persist()`` handle passed through this shape."""
    # persist: the self-join would otherwise re-run the assignment UDF on
    # both sides (the executedPlan duplicates the subtree per join branch)
    lists = ivf_assign(emb, centroids).persist()
    a = lists.select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a"),
        "bucket",
    )
    b = lists.select(F.col("vec_id").alias("vec_b"),
                     F.col("embedding").alias("emb_b"), "bucket")
    pairs = a.join(b, "bucket").filter(F.col("vec_a") < F.col("vec_b"))
    scored = pairs.select(
        "vec_a", "vec_b",
        F.round(cosine_expr(F.col("emb_a"), F.col("emb_b")), 6).alias("cos"),
    )
    return scored.filter(F.col("cos") >= threshold)


def ivf_train(
    emb: DataFrame,
    k: int = 8,
    max_sample: int = 10_000,
    iters: int = 10,
) -> DataFrame:
    """Train IVF coarse-quantizer centroids: spherical k-means on a
    deterministic hash-ordered sample.

    Scale shape: the sample is a ``TakeOrdered`` over ``xxhash64(vec_id)``
    — one corpus pass with per-partition top-k, no full sort, and the same
    sample regardless of partitioning (resume-stable). Training runs
    driver-side on ≤``max_sample`` vectors (k-means on a bounded sample is
    the standard IVF build — FAISS trains exactly this way); assignment of
    the FULL corpus stays distributed via :func:`ivf_assign`.

    Returns (vec_id=cid, embedding) shaped like the centroid tables
    ``ivf_assign``/``ivf_topk`` already take."""
    rows = (
        emb.select("vec_id", "embedding")
        .orderBy(F.xxhash64(F.col("vec_id").cast("string")))
        .limit(max_sample)
        .collect()
    )
    X = np.array([[float(v) for v in r["embedding"]] for r in rows], dtype="f8")
    norms = np.sqrt((X * X).sum(axis=1))
    norms[norms == 0.0] = 1.0
    X = X / norms[:, None]
    # deterministic farthest-point init (greedy k-means++ without the
    # randomness): next seed = the point least similar to its nearest
    # already-chosen centroid — avoids the merged-cluster local optima of
    # naive first-k init
    seeds = [0]
    best = X @ X[0]
    for _ in range(1, k):
        nxt = int(np.argmin(best))
        seeds.append(nxt)
        best = np.maximum(best, X @ X[nxt])
    C = X[seeds].copy()
    for _ in range(iters):
        sim = X @ C.T
        assign = np.argmax(sim, axis=1)
        served = sim.max(axis=1)
        for j in range(k):
            members = X[assign == j]
            if len(members) == 0:
                # reseed to the globally worst-served point, updating the
                # served similarity between reseeds (two empty clusters in
                # one iteration otherwise grab the SAME point — duplicate
                # centroids; r4 review finding)
                pick = int(np.argmin(served))
                C[j] = X[pick]
                served = np.maximum(served, X @ C[j])
                continue
            m = members.mean(axis=0)
            n = np.linalg.norm(m)
            C[j] = m / (n if n > 0 else 1.0)
    # list cells + explicit schema: numpy-array cells only infer under
    # Arrow; a plain session must not be required to run this.
    pdf = pd.DataFrame({
        "vec_id": np.arange(k, dtype="i8"),
        "embedding": [row.astype("f8").tolist() for row in C],
    })
    return emb.sparkSession.createDataFrame(
        pdf, schema="vec_id bigint, embedding array<double>"
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


def _collect_planes(planes: DataFrame) -> list[list[float]]:
    """Driver-side plane vectors, ordered by plane id (they are always few)."""
    rows = sorted(planes.collect(), key=lambda r: int(r["vec_id"]))
    return [[float(x) for x in r["embedding"]] for r in rows]


def bucket_expr(plane_vecs: list[list[float]], emb_col: str = "embedding"):
    """Bucket id = concatenated signs of dot(v, plane_p) — the P planes are
    inlined as literal arrays (P stays small by construction), so the bucket
    is a pure narrow-map Catalyst expression: no shuffle, no ×P row
    multiplication. The earlier design crossJoined the corpus with the
    planes and groupBy'd it back just to concatenate P bits — a corpus-sized
    shuffle for a per-row computation."""
    bits = []
    for vec in plane_vecs:
        lit_vec = F.array(*[F.lit(x) for x in vec])
        bits.append(
            F.when(_dot(F.col(emb_col), lit_vec) >= 0, F.lit("1"))
            .otherwise(F.lit("0"))
        )
    return F.concat(*bits)


def lsh_buckets(emb: DataFrame, planes: DataFrame, n_planes: int = 4) -> DataFrame:
    """Hyperplane-sign LSH bucket per vector (planes = the first P corpus
    vectors by vec_id, so the DuckDB oracle can rebuild them exactly)."""
    return emb.select(
        "vec_id", bucket_expr(_collect_planes(planes)).alias("bucket")
    )


# ---------------------------------------------------------------------------
# Product quantization (Jégou et al. 2011, "Product Quantization for
# Nearest Neighbor Search") — the memory-scale half of the IVF story
# above. IVF prunes WHICH vectors a query touches; PQ shrinks WHAT is
# stored and scanned per vector: each D-dim embedding becomes M small
# integer codes (argmin sub-vector centroid per subspace), and search
# scores candidates from the codes + a per-query (M x K) lookup table —
# the raw vectors never move. At 100 TB that is the difference between
# scanning 256 B/vector of float and M bytes/vector of codes with the
# LUT broadcast.
#
# The codebook argument everywhere is a (sub, code, cb) DataFrame so the
# oracle-gated queries can derive it from FIXED table rows (same trick as
# the ivf_* centroid-row convention); pq_train builds a real one via
# per-subspace k-means on the deterministic hash sample.
# ---------------------------------------------------------------------------

PQ_M = 4  # subspaces
PQ_K = 16  # codes per subspace


def pq_codebook_from_rows(emb: DataFrame, m: int = PQ_M, k: int = PQ_K) -> DataFrame:
    """Deterministic codebook from the first ``k`` corpus rows: subspace
    ``s``'s code ``c`` is that slice of row ``c`` — reconstructible in SQL
    (the ivf centroid-row convention, so the DuckDB oracle rebuilds it
    bit-for-bit)."""
    rows = emb.filter(F.col("vec_id") < k).select("vec_id", "embedding")
    dsub = F.floor(F.size("embedding") / m).cast("int")
    out = rows.select(
        F.col("vec_id").cast("int").alias("code"),
        F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("sub"),
        "embedding",
    )
    return out.select(
        "sub", "code",
        F.slice("embedding", F.col("sub") * dsub + 1, dsub).alias("cb"),
    )


def _collect_codebook(codebooks: DataFrame) -> np.ndarray:
    """(M, K, dsub) dense tensor, ordered by (sub, code). The (sub, code)
    grid must be COMPLETE: a silent zero-fill would let pq_encode emit a
    phantom code whose LUT row doesn't exist, and the scoring inner join
    would then drop that subspace's term from the ADC sum with no error
    (r4 review finding) — fail loudly instead."""
    rows = sorted(
        ((int(r["sub"]), int(r["code"]), [float(x) for x in r["cb"]])
         for r in codebooks.collect()),
        key=lambda t: (t[0], t[1]),
    )
    if not rows:
        raise ValueError("empty PQ codebook")
    m = max(s for s, _, _ in rows) + 1
    k = max(c for _, c, _ in rows) + 1
    want = {(s, c) for s in range(m) for c in range(k)}
    have = {(s, c) for s, c, _ in rows}
    if have != want:
        raise ValueError(
            f"PQ codebook has gaps: missing (sub, code) {sorted(want - have)[:8]} "
            "(pq_codebook_from_rows needs contiguous vec_id 0..K-1 rows; "
            "train a real codebook with pq_train otherwise)"
        )
    dsub = len(rows[0][2])
    C = np.zeros((m, k, dsub), dtype="f8")
    for s, c, v in rows:
        C[s, c] = v
    return C


def pq_encode(
    emb: DataFrame, codebooks: DataFrame, carry: tuple = ()
) -> DataFrame:
    """(vec_id, codes array<int>): per subspace, the L2-nearest codebook
    entry (distances rounded HALF_UP at 6 before the argmin, ties to the
    smallest code — the oracle's expression, same convention as
    ``ivf_assign``). One Arrow batch matmul per subspace inside a pure
    NARROW map: the corpus is scanned once, never shuffled, and the plan
    size is independent of M*K (the codebook rides the UDF closure)."""
    C = _collect_codebook(codebooks)
    m, k, dsub = C.shape
    cnorm2 = (C * C).sum(axis=2)  # (M, K)

    @F.pandas_udf("array<int>")
    def codes(emb_s: pd.Series) -> pd.Series:
        X = np.array(emb_s.tolist(), dtype="f8")[:, : m * dsub]
        Xs = X.reshape(len(X), m, dsub)  # (B, M, dsub)
        out = np.empty((len(X), m), dtype="i4")
        for s in range(m):
            d2 = (
                (Xs[:, s] * Xs[:, s]).sum(axis=1)[:, None]
                - 2.0 * (Xs[:, s] @ C[s].T)
                + cnorm2[s][None, :]
            )
            out[:, s] = np.argmin(_round_half_up(d2, 6), axis=1)
        return pd.Series([row.tolist() for row in out])

    return emb.select(
        "vec_id", *carry, codes(F.col("embedding")).alias("codes")
    )


def pq_topk(
    emb: DataFrame, codebooks: DataFrame, queries: DataFrame, k: int = 3,
    codes: DataFrame | None = None,
) -> DataFrame:
    """ADC top-k by inner product: candidates are scored from their CODES
    plus a per-query (M x K) dot-product lookup table — the raw corpus
    vectors never reach the scoring join. Fully relational: codes
    posexplode + broadcast LUT join + one (query, vec) hash agg + the
    per-query rank window; every arithmetic step (per-sub dot rounded at
    6, summed, re-rounded) is replayed verbatim by the DuckDB oracle."""
    # posexplode_OUTER: plain posexplode injects a size()>0 + isnotnull
    # pre-filter that references the UDF column, and the optimizer then
    # evaluates the encode UDF TWICE (once for the filter, once for the
    # generate — seen in the executed plan). codes is always a non-null
    # M-array, so the outer variant is semantically identical and keeps
    # one ArrowEvalPython (plan-asserted pytest).
    # ``codes``: a prebuilt (vec_id, codes) table (jobs/ann_build.py
    # artifact) — at scale the one-off encode must not rerun per query
    # batch (r4 review finding)
    cods = (codes if codes is not None
            else pq_encode(emb, codebooks)).select(
        "vec_id", F.posexplode_outer("codes").alias("sub", "code")
    )
    q = queries.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    dsub = F.size("cb")
    lut = (
        q.crossJoin(F.broadcast(codebooks))
        .select(
            "query_id", "sub", "code",
            F.round(
                _dot(F.slice("q_emb", F.col("sub") * dsub + 1, dsub),
                     F.col("cb")),
                6,
            ).alias("part"),
        )
    )
    scored = (
        cods.join(F.broadcast(lut), ["sub", "code"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.round(F.sum("part"), 6).alias("adc"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("adc"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def pq_train(
    emb: DataFrame,
    m: int = PQ_M,
    k: int = PQ_K,
    max_sample: int = 10_000,
    iters: int = 10,
) -> DataFrame:
    """Train a real PQ codebook: per-subspace L2 k-means on the same
    deterministic hash-ordered sample as :func:`ivf_train` (bounded
    driver-side work — the FAISS build convention); encoding the full
    corpus stays distributed via :func:`pq_encode`. Deterministic
    farthest-point init per subspace. Returns the (sub, code, cb) frame
    ``pq_encode``/``pq_topk`` take."""
    rows = (
        emb.select("vec_id", "embedding")
        .orderBy(F.xxhash64(F.col("vec_id").cast("string")))
        .limit(max_sample)
        .collect()
    )
    X = np.array([[float(v) for v in r["embedding"]] for r in rows], dtype="f8")
    dsub = X.shape[1] // m
    out_rows = []
    for s in range(m):
        Xs = X[:, s * dsub:(s + 1) * dsub]
        seeds = [0]
        d = ((Xs - Xs[0]) ** 2).sum(axis=1)
        for _ in range(1, k):
            nxt = int(np.argmax(d))
            seeds.append(nxt)
            d = np.minimum(d, ((Xs - Xs[nxt]) ** 2).sum(axis=1))
        C = Xs[seeds].copy()
        for _ in range(iters):
            d2 = ((Xs[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            served = d2.min(axis=1)
            for j in range(k):
                members = Xs[assign == j]
                if len(members) == 0:
                    # reseed to the worst-served point and UPDATE the
                    # served distances before the next reseed — a stale
                    # d2 gave every empty cluster the same point
                    # (duplicate dead codes; r4 review finding)
                    pick = int(np.argmax(served))
                    C[j] = Xs[pick]
                    served = np.minimum(
                        served, ((Xs - C[j]) ** 2).sum(axis=1)
                    )
                else:
                    C[j] = members.mean(axis=0)
        out_rows.extend(
            {"sub": s, "code": c, "cb": C[c].tolist()} for c in range(k)
        )
    pdf = pd.DataFrame(out_rows)
    return emb.sparkSession.createDataFrame(
        pdf, schema="sub int, code int, cb array<double>"
    )


def pq_index(
    emb: DataFrame, centroids: DataFrame, codebooks: DataFrame
) -> DataFrame:
    """The serving index in ONE narrow pass: (vec_id, bucket, codes) —
    IVF list assignment and PQ codes computed together so the bucket
    rides the codes row (downstream search prunes lists with a broadcast
    join on ``bucket``; the earlier shape equi-joined the corpus-wide
    codes with the corpus-wide lists on vec_id — a corpus-corpus shuffle
    for information both one-pass maps already had, r4 review finding).
    This is the table ``jobs/ann_build.py`` persists."""
    assigned = ivf_assign(emb, centroids)  # vec_id, embedding, bucket
    return pq_encode(assigned, codebooks, carry=("bucket",))


def ivfpq_topk(
    emb: DataFrame,
    centroids: DataFrame,
    codebooks: DataFrame,
    queries: DataFrame,
    k: int = 3,
    nprobe: int = 2,
    index: DataFrame | None = None,
) -> DataFrame:
    """IVF-PQ search (the FAISS IndexIVFPQ shape — both scale levers at
    once): IVF bounds WHICH vectors a query touches (only the ``nprobe``
    probed lists — pruned by a broadcast join on the ``bucket`` column
    the index row already carries, no corpus-corpus join), PQ bounds
    WHAT is scanned per vector (integer codes + the broadcast per-query
    LUT; raw embeddings appear nowhere after the one-pass index map).
    Pass a prebuilt ``index`` (the ``pq_index``/ann_build artifact) so
    repeated query batches never re-encode the corpus. Returns ADC
    top-k within the probed lists — the candidate-generation stage of
    the standard two-stage search; exact re-rank joins the raw vectors
    for the ≤ k survivors only."""
    idx = index if index is not None else pq_index(emb, centroids, codebooks)
    cods = idx.select(
        "vec_id", "bucket",
        F.posexplode_outer("codes").alias("sub", "code"),
    )

    c = centroids.select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("c_emb")
    )
    q = queries.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    qprobe = q.crossJoin(F.broadcast(c)).select(
        "query_id", "q_emb", "cid",
        F.round(cosine_expr(F.col("q_emb"), F.col("c_emb")), 6).alias("ccos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("ccos"), F.asc("cid"))
    probes = (
        qprobe.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= nprobe)
        .select("query_id", "q_emb", F.col("cid").alias("bucket"))
    )

    dsub = F.size("cb")
    lut = (
        probes.select("query_id", "q_emb").distinct()
        .crossJoin(F.broadcast(codebooks))
        .select(
            "query_id", "sub", "code",
            F.round(
                _dot(F.slice("q_emb", F.col("sub") * dsub + 1, dsub),
                     F.col("cb")),
                6,
            ).alias("part"),
        )
    )
    cand = cods.join(
        F.broadcast(probes.select("query_id", "bucket")), "bucket"
    ).filter(F.col("vec_id") != F.col("query_id"))
    scored = (
        cand.join(F.broadcast(lut), ["query_id", "sub", "code"])
        .groupBy("query_id", "vec_id")
        .agg(F.round(F.sum("part"), 6).alias("adc"))
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("adc"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
    )


def ann_search(
    emb: DataFrame,
    centroids: DataFrame,
    codebooks: DataFrame,
    queries: DataFrame,
    k: int = 3,
    nprobe: int = 2,
    expand: int = 8,
    index: DataFrame | None = None,
) -> DataFrame:
    """The complete two-stage ANN search as one call (the production
    shape): IVF-PQ candidate generation (``ivfpq_topk`` with
    ``k*expand`` candidates — codes + LUT only) followed by EXACT cosine
    re-rank that joins raw vectors for the surviving candidates alone.
    Returns (query_id, vec_id, cos, rank) shaped like
    :func:`brute_topk`, so accuracy is a drop-in comparison. At 100 TB
    the corpus-sized stages never touch raw embeddings; the exact stage
    reads ``|queries| * k * expand`` vectors via an equi-join."""
    cand = ivfpq_topk(
        emb, centroids, codebooks, queries, k=k * expand, nprobe=nprobe,
        index=index,
    ).select("query_id", "vec_id")
    q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        _norm(F.col("embedding")).alias("q_nrm"),
    )
    emb_n = emb.select(
        "vec_id", "embedding", _norm(F.col("embedding")).alias("e_nrm")
    )
    scored = (
        cand.join(emb_n, "vec_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id", "vec_id",
            F.round(
                _dot(F.col("q_emb"), F.col("embedding"))
                / (F.col("q_nrm") * F.col("e_nrm")),
                6,
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
