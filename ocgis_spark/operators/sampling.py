"""Deterministic sampling for training-data pipelines.

Spark's ``df.sample`` / ``sampleBy`` draw from a per-partition RNG whose
output depends on partitioning — unacceptable for reproducible corpus
construction (and impossible to oracle-check). These operators derive the
keep/drop decision from the row's OWN key via a multiplicative hash, so

* the sample is identical across engines, partitionings, and reruns;
* it is a pure narrow filter (no shuffle, pushes past projections);
* re-running on a grown corpus keeps every previously-kept row whose key
  is unchanged (stable incremental sampling).

Mirrors the reference's deterministic test-data subsetting (snippet /
slice semantics, ``src/ocgis/collection/field.py`` time slicing) but
generalized to quota sampling by stratum — the "domain mixing" stage of a
corpus pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Knuth's multiplicative hash constant (2^32 / phi); the modulus is prime
#: so small strides in the key don't alias to strides in the bucket.
HASH_MULT = 2654435761
HASH_MOD = 999979


def hash_bucket(key: Column, buckets: int = 1000) -> Column:
    """Deterministic bucket in [0, buckets) from a NON-NEGATIVE integer
    key column. Dialect-neutral: ``((key * M) % P) % buckets`` with BIGINT
    arithmetic reproduces bit-for-bit in DuckDB. Both dialects' ``%``
    takes the dividend's sign, so a negative key yields a NEGATIVE bucket
    — which passes every ``bucket < rate`` sampling filter unconditionally.
    Keys here are row ids (doc_id/user_id), non-negative by construction;
    map signed keys through ``abs`` or ``pmod`` BEFORE bucketing."""
    return ((key.cast("bigint") * F.lit(HASH_MULT)) % F.lit(HASH_MOD)) % F.lit(buckets)


def uniform_sample(
    df: DataFrame, rate_permille: int, key: str = "doc_id"
) -> DataFrame:
    """Keep ~rate_permille/1000 of rows, deterministically by key."""
    return df.filter(hash_bucket(F.col(key)) < F.lit(rate_permille))


def stratified_sample(
    df: DataFrame,
    rates_permille: dict[str, int],
    stratum: str = "lang",
    key: str = "doc_id",
    default_permille: int = 0,
) -> DataFrame:
    """Per-stratum quota sampling (domain/language mixing): keep a row iff
    its hash bucket < the stratum's per-mille rate. One CASE chain over a
    narrow filter — no shuffle, no RNG, exactly reproducible. Strata not
    listed get ``default_permille``."""
    rate = F.lit(default_permille)
    for value, permille in sorted(rates_permille.items()):
        rate = F.when(F.col(stratum) == value, F.lit(int(permille))).otherwise(rate)
    return df.filter(hash_bucket(F.col(key)) < rate)


def shuffle_key(key: Column) -> Column:
    """Deterministic pseudo-random ordering key from the row's own id —
    the 'global shuffle' stage of corpus construction. Sorting by
    (shuffle_key, key) is a total order that is identical across engines
    and reruns, unlike ``orderBy(rand())``."""
    return (key.cast("bigint") * F.lit(HASH_MULT)) % F.lit(HASH_MOD)


def shuffle_corpus(df: DataFrame, key: str = "doc_id", num_files: int | None = None) -> DataFrame:
    """Order the corpus pseudo-randomly without a global bottleneck:
    range-partition on the shuffle key (Spark samples range boundaries —
    one exchange, balanced files) and sort within partitions. The
    concatenation of output files in partition order IS the shuffled
    corpus; no single-partition window/row_number anywhere."""
    sk = shuffle_key(F.col(key)).alias("_shuf")
    out = df.withColumn("_shuf", sk)
    parts = [out["_shuf"], F.col(key)]
    if num_files:
        out = out.repartitionByRange(num_files, *parts)
    else:
        out = out.repartitionByRange(*parts)
    return out.sortWithinPartitions(*parts).drop("_shuf")


def split_column(key: Column, permille_train: int = 750) -> Column:
    """'train' / 'test' label from the same hash family (three-way splits
    chain another threshold)."""
    return F.when(
        hash_bucket(key) < F.lit(permille_train), F.lit("train")
    ).otherwise(F.lit("test"))


def temperature_mixture(
    df: DataFrame, stratum: str = "lang", key: str = "doc_id",
) -> DataFrame:
    """Temperature-balanced domain mixing (alpha = 0.5): subsample each
    stratum so the output mixture is proportional to n_d^alpha instead
    of n_d — the standard multilingual/domain rebalance (small domains
    upweighted relative to their raw share). The smallest stratum keeps
    everything; stratum d keeps rate_d = sqrt(n_min / n_d), realized
    through the deterministic hash bucket (no RNG, partitioning-
    independent).

    alpha is FIXED at 1/2 so the per-stratum rate is a single IEEE
    sqrt + division — both correctly rounded, hence bit-identical in
    Spark and DuckDB (a general pow() is not guaranteed to round the
    same across engines, which would flip boundary rows between the
    query and its oracle). Other temperatures: compose uniform_sample
    with an externally computed rate table.

    Plan: one stratum-count hash agg, a broadcast rate join, a narrow
    filter — the corpus is read once and never shuffled.

    NULL-stratum rows are EXCLUDED before counting: groupBy keeps a
    NULL group whose (usually tiny) count would set n_min and crush
    every real stratum's keep-rate, while the equi-join drops the
    NULL rows themselves anyway (r4 review finding)."""
    df = df.filter(F.col(stratum).isNotNull())
    counts = df.groupBy(stratum).agg(F.count(F.lit(1)).alias("n_d"))
    n_min = counts.agg(F.min("n_d").alias("n_min"))
    rates = counts.crossJoin(F.broadcast(n_min)).select(
        stratum,
        F.floor(
            F.lit(1000.0)
            * F.sqrt(F.col("n_min").cast("double") / F.col("n_d").cast("double"))
        ).alias("rate_pm"),
    )
    return df.join(F.broadcast(rates), stratum).filter(
        hash_bucket(F.col(key)) < F.col("rate_pm")
    )


def unimax_allocation(
    counts: list[tuple[str, int]], budget: int, epoch_cap: float = 1.0
) -> list[tuple[str, int, int, int]]:
    """UniMax budget waterfilling (Chung et al. 2023, "UniMax: Fairer and
    More Effective Language Sampling"): spread a total document budget
    uniformly over strata, capping each stratum at ``epoch_cap`` epochs
    of its own data and redistributing the leftover to the rest.

    Deterministic integer form: strata ascend by (capacity, name); at
    each step the stratum receives ``min(capacity, remaining //
    strata_left)`` (floor division — the largest stratum absorbs the
    rounding shortfall, never more than strata_left extra docs total).
    Pure driver-side arithmetic over one row per stratum — the
    bounded-collect pattern of the covering/centroid preps.

    Returns ``[(stratum, n_docs, capacity, alloc)]`` sorted by stratum.
    """
    caps = sorted(
        (int(epoch_cap * n), s, int(n)) for s, n in counts
    )
    remaining = int(budget)
    out = []
    for i, (cap, s, n) in enumerate(caps):
        share = remaining // (len(caps) - i)
        alloc = min(cap, share)
        remaining -= alloc
        out.append((s, n, cap, alloc))
    return sorted(out)


def unimax_mixture(
    df: DataFrame,
    budget: int,
    epoch_cap: float = 1.0,
    stratum: str = "lang",
    key: str = "doc_id",
) -> DataFrame:
    """Realize a UniMax allocation as rows: each stratum emits
    ``alloc // n`` full epochs of itself plus a hash-sampled tail at
    ~``(alloc % n) / n`` (per-mille floor — the approximate-rate contract
    of every hash sampler here). Output carries an ``epoch`` column
    (1-based; the tail is epoch ``full + 1``) so downstream shuffles can
    de-correlate repeats.

    Plan: one stratum-count hash agg collected to the driver (≤ one row
    per stratum), a broadcast allocation join, then a narrow
    ``explode(sequence(...))`` fan-out — the corpus is scanned once and
    never shuffled; output size is budget-bounded, not corpus-bounded.

    NULL strata are excluded before counting (the temperature_mixture
    rationale)."""
    df = df.filter(F.col(stratum).isNotNull())
    rows = df.groupBy(stratum).agg(F.count(F.lit(1)).alias("n")).collect()
    alloc = unimax_allocation(
        [(r[stratum], r["n"]) for r in rows], budget, epoch_cap
    )
    spark = df.sparkSession
    from pyspark.sql.types import LongType, StructField, StructType

    # carry the stratum column's REAL type into the plan relation — a
    # hardcoded string type would break the equi-join (and createDataFrame
    # verification) for integer strata (r4s11 review)
    schema = StructType(
        [StructField(stratum, df.schema[stratum].dataType)]
        + [StructField(c, LongType()) for c in ("_n", "_full", "_tail_pm")]
    )
    plan = spark.createDataFrame(
        [(s, n, a // n, (a % n) * 1000 // n) for s, n, _, a in alloc],
        schema=schema,
    )
    joined = df.join(F.broadcast(plan), stratum)
    n_epochs = F.col("_full") + F.when(
        hash_bucket(F.col(key)) < F.col("_tail_pm"), F.lit(1)
    ).otherwise(F.lit(0))
    # sequence(1, 0) yields the DESCENDING [1, 0] (auto-step -1), so a
    # zero-epoch row must be filtered BEFORE the explode, not relied on
    # to produce an empty array
    return (
        joined.withColumn("_ne", n_epochs)
        .filter(F.col("_ne") >= 1)
        .withColumn("epoch", F.explode(F.sequence(F.lit(1), F.col("_ne"))))
        .drop("_n", "_full", "_tail_pm", "_ne")
    )


# ---------------------------------------------------------------------------
# DSIR — Data Selection via Importance Resampling (Xie et al. 2023).
# Select raw-corpus documents that look like a (small) target domain:
# fit hashed-n-gram bag-of-words models over the target and the raw
# corpus, weight every raw document by its log likelihood ratio, and
# resample top-k under Gumbel perturbation. The mixing-side twin of
# CCNet terciles (quality) and UniMax (language budget): DSIR answers
# "which documents", not "how many per language".
#
# Scale shape: the corpus is exploded once into (unigram + bigram)
# occurrences — a narrow per-row fan-out, never a self-join — and every
# model table is bucket-bounded (≤ m rows after the hash agg's map-side
# partials), so the delta table broadcasts forever; per-doc weights are
# ONE hash agg over the occurrences. Nothing pairs the corpus; the
# target frame is small by definition (a domain sample).
# ---------------------------------------------------------------------------


def _ngram_occurrences(df: DataFrame, text: str, m: int) -> DataFrame:
    """(doc_id, bucket) — one row per unigram AND bigram occurrence,
    md5-slice-hashed into ``m`` buckets (dialect-neutral, so the DuckDB
    oracle reproduces the buckets bit-for-bit). Mirrors lm_score's
    two-step explode: the split array must be a NAMED column so the
    post-explode element_at does not recompute the split per row."""
    from .sketch import md5_slice_int_sql
    from .text import tokens_col

    ws = df.select("doc_id", tokens_col(text).alias("ws")).filter(
        F.size("ws") >= 1
    )
    pos = ws.select(
        "doc_id", "ws",
        F.explode(F.sequence(F.lit(1), F.size("ws"))).alias("_i"),
    ).select(
        "doc_id",
        F.element_at("ws", F.col("_i")).alias("w1"),
        # empty string marks "no bigram here" (last position)
        F.coalesce(
            F.element_at("ws", F.col("_i") + 1), F.lit("")
        ).alias("w2"),
    )
    # ONE explode chain emits both gram orders: per position, an array of
    # [unigram?, bigram?] with the inapplicable slots nulled and
    # compacted away. The previous two-filtered-branch union scanned and
    # exploded the input TWICE per instantiation (r4s13 review finding).
    feats = pos.select(
        "doc_id",
        F.explode(
            F.array_compact(
                F.array(
                    F.when(F.col("w1") != "", F.col("w1")),
                    F.when(
                        (F.col("w1") != "") & (F.col("w2") != ""),
                        F.concat_ws(" ", "w1", "w2"),
                    ),
                )
            )
        ).alias("feat"),
    )
    return feats.select(
        "doc_id",
        (F.expr(md5_slice_int_sql("feat", 0)) % F.lit(m)).alias("bucket"),
    )


def _ngram_occurrences_sql(table: str, text: str, m: int) -> str:
    """Oracle twin of :func:`_ngram_occurrences` (same split rule, same
    md5 slice, same empty-token handling)."""
    from .sketch import md5_slice_int_sql

    return (
        f"SELECT doc_id, {md5_slice_int_sql('feat', 0)} % {m} AS bucket "
        f"FROM ("
        f"SELECT doc_id, a[CAST(i AS INT)] AS feat FROM ("
        f"SELECT doc_id, string_split({text}, ' ') AS a, "
        f"unnest(generate_series(1, len(a))) AS i FROM {table}) u "
        f"WHERE a[CAST(i AS INT)] <> '' "
        f"UNION ALL "
        f"SELECT doc_id, a[CAST(i AS INT)] || ' ' || a[CAST(i AS INT) + 1] "
        f"AS feat FROM ("
        f"SELECT doc_id, string_split({text}, ' ') AS a, "
        f"unnest(generate_series(1, len(a) - 1)) AS i FROM {table}) b "
        f"WHERE a[CAST(i AS INT)] <> '' AND a[CAST(i AS INT) + 1] <> ''"
        f") occ"
    )


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    text: str = "text",
    m: int = 1024,
    alpha: float = 0.5,
) -> DataFrame:
    """Per-document DSIR importance log-weight over the raw corpus:
    ``logw(doc) = Σ_occurrences ln(p_target[b] / p_raw[b])`` with add-α
    smoothed bucket models ``p[b] = (c[b] + α) / (N + α·m)`` over the
    FULL bucket domain (zero-count buckets still get smoothed mass).
    Raw sums (not means): document length amplifies evidence, per the
    paper's bag-of-hashed-ngrams likelihood.

    Plan: two bucket-bounded hash aggs (target, raw) → an m-row delta
    table (totals as a single-partition window sum over the m rows, so
    no subtree re-instantiation; broadcast) → one occurrence join + one
    per-doc hash agg. The raw corpus is scanned+exploded exactly TWICE
    (model agg, weight join) and the target ONCE — plan-asserted in
    tests. Returns (doc_id, logw) for every raw doc with ≥ 1 token."""
    spark = raw.sparkSession
    occ_r = _ngram_occurrences(raw, text, m)
    occ_t = _ngram_occurrences(target, text, m)

    def dist(occ):
        return occ.groupBy("bucket").agg(
            F.count(F.lit(1)).cast("double").alias("c")
        )

    domain = spark.range(m).select(F.col("id").alias("bucket"))
    a = F.lit(float(alpha))
    am = F.lit(float(alpha) * m)
    ct = domain.join(dist(occ_t), "bucket", "left").select(
        "bucket", F.coalesce("c", F.lit(0.0)).alias("ct")
    )
    cr = domain.join(dist(occ_r), "bucket", "left").select(
        "bucket", F.coalesce("c", F.lit(0.0)).alias("cr")
    )
    # N_t / N_r as single-partition window sums over the m-row joined
    # model table — a separate .agg() would RE-INSTANTIATE the whole
    # occurrence subtree (another corpus scan+explode each, r4s13 review
    # finding); the window costs one m-row exchange instead
    w0 = Window.partitionBy(F.lit(1))
    delta = ct.join(cr, "bucket").select(
        "bucket",
        (
            F.log((F.col("ct") + a) / (F.sum("ct").over(w0) + am))
            - F.log((F.col("cr") + a) / (F.sum("cr").over(w0) + am))
        ).alias("delta"),
    )
    return (
        occ_r.join(F.broadcast(delta), "bucket")
        .groupBy("doc_id")
        .agg(F.sum("delta").alias("logw"))
    )


def dsir_sample(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    text: str = "text",
    m: int = 1024,
    alpha: float = 0.5,
) -> DataFrame:
    """Gumbel-top-k importance resample: ``gkey = round(logw + g, 6)``
    with ``g = -ln(-ln(u))`` and ``u`` the deterministic hash-uniform
    ``(shuffle_key(doc_id) + 0.5) / HASH_MOD`` — sampling k documents
    with probability ∝ w without normalizing, reproducible across
    engines and reruns (no RNG). The key is ROUNDED before ranking so
    both engines rank identical values (cross-engine float drift cannot
    flip a near-tie); doc_id breaks exact ties. Ranking is a top-k
    (TakeOrdered), never a full sort shuffle."""
    w = dsir_weights(raw, target, text=text, m=m, alpha=alpha)
    u = (shuffle_key(F.col("doc_id")) + F.lit(0.5)) / F.lit(float(HASH_MOD))
    gumbel = -F.log(-F.log(u))
    return (
        w.select(
            "doc_id",
            F.round(F.col("logw") + gumbel, 6).alias("gkey"),
        )
        .orderBy(F.col("gkey").desc(), F.col("doc_id"))
        .limit(k)
    )


def dsir_sample_sql(
    raw_table: str = "documents",
    target_sql: str = "SELECT * FROM documents WHERE lang = 'en'",
    k: int = 60,
    text: str = "text",
    m: int = 1024,
    alpha: float = 0.5,
) -> str:
    """Oracle twin of :func:`dsir_sample` (same buckets, same smoothing
    arithmetic, same hash-uniform Gumbel, same rounded ranking key)."""
    from ..fixtures import _f

    af = _f(float(alpha))
    amf = _f(float(alpha) * m)
    return f"""
WITH tgt AS ({target_sql}),
occ_r AS ({_ngram_occurrences_sql(raw_table, text, m)}),
occ_t AS ({_ngram_occurrences_sql('tgt', text, m)}),
domain AS (SELECT unnest(generate_series(0, {m - 1})) AS bucket),
ct AS (SELECT d.bucket,
        COALESCE(t.c, CAST(0 AS DOUBLE)) AS ct
       FROM domain d LEFT JOIN (SELECT bucket, CAST(count(*) AS DOUBLE) AS c
                                FROM occ_t GROUP BY bucket) t
       ON d.bucket = t.bucket),
cr AS (SELECT d.bucket,
        COALESCE(r.c, CAST(0 AS DOUBLE)) AS cr
       FROM domain d LEFT JOIN (SELECT bucket, CAST(count(*) AS DOUBLE) AS c
                                FROM occ_r GROUP BY bucket) r
       ON d.bucket = r.bucket),
nt AS (SELECT sum(ct) AS nt FROM ct),
nr AS (SELECT sum(cr) AS nr FROM cr),
delta AS (SELECT ct.bucket,
        ln((ct.ct + {af}) / (nt.nt + {amf}))
      - ln((cr.cr + {af}) / (nr.nr + {amf})) AS delta
       FROM ct JOIN cr ON ct.bucket = cr.bucket CROSS JOIN nt CROSS JOIN nr),
w AS (SELECT o.doc_id, sum(d.delta) AS logw
      FROM occ_r o JOIN delta d ON o.bucket = d.bucket GROUP BY o.doc_id)
SELECT doc_id,
       round(logw - ln(-ln(
           ((CAST(doc_id AS BIGINT) * {HASH_MULT}) % {HASH_MOD} + 0.5E0)
           / CAST({HASH_MOD} AS DOUBLE))), 6) AS gkey
FROM w
ORDER BY gkey DESC, doc_id
LIMIT {k}"""


# ---- weighted sampling without replacement (Efraimidis–Spirakis) ----

def weighted_sample(
    df: DataFrame,
    k: int,
    weight: str,
    stratum: str | None = None,
    key: str = "doc_id",
) -> DataFrame:
    """Weighted sample WITHOUT replacement: top-``k`` rows (per
    ``stratum`` if given) by the A-ES key (Efraimidis & Spirakis 2006)
    — rank by u^(1/w), here the monotone-equivalent ``ln(u)/w`` with u a
    DETERMINISTIC hash uniform of the row key (the module's no-RNG
    contract: identical across engines, partitionings, and reruns, and
    a grown corpus never evicts a kept row except by genuinely
    out-scoring it). P(row in sample) is the weighted
    without-replacement inclusion probability — the principled way to
    bias a corpus sample toward long/high-quality docs while keeping it
    a true sample (a plain ORDER BY weight LIMIT k takes ONLY the
    heaviest rows).

    Rows with NULL or non-positive weight are dropped (they have no
    defined inclusion probability). Ranking uses ``row_number`` ordered
    by (score DESC, key) — the key tie-break pins the order even for
    equal scores; score gaps between distinct hash uniforms dwarf the
    ~1-ulp libm ``ln`` drift, the residual cross-engine risk class the
    geodesic family already accepts.

    100-TB posture: ONE hash exchange on the stratum (the window);
    everything else is a narrow map. For k small relative to partitions,
    swap the window for a per-partition top-k + merge if the single
    stratum's sort ever dominates — at corpus scale the stratum count
    usually keeps partitions balanced."""
    from .sketch import H_MOD, hash_sql

    h = hash_sql(key)
    # u in (0, 1]: +1 so u never hits 0 (ln(0) = -inf would be a valid
    # but degenerate score; keeping u positive keeps scores finite)
    score = F.expr(
        f"ln((CAST({h} AS DOUBLE) + 1.0E0) / {H_MOD}.0E0) "
        f"/ CAST({weight} AS DOUBLE)"
    )
    filt = df.filter(F.expr(f"({weight}) IS NOT NULL AND ({weight}) > 0"))
    parts = [stratum] if stratum else []
    w = Window.partitionBy(*parts).orderBy(
        F.col("_aes").desc(), F.col(key))
    ranked = filt.withColumn("_aes", score).withColumn(
        "_rn", F.row_number().over(w))
    return ranked.filter(F.col("_rn") <= int(k)).drop("_aes", "_rn")


def weighted_sample_sql(
    src_sql: str,
    k: int,
    weight: str,
    stratum: str | None = None,
    key: str = "doc_id",
) -> str:
    """Oracle twin of :func:`weighted_sample` (same score expression and
    (score DESC, key) row_number ranking)."""
    from .sketch import H_MOD, hash_sql

    h = hash_sql(key)
    part = f"PARTITION BY {stratum} " if stratum else ""
    return (
        f"SELECT * EXCLUDE (_aes, _rn) FROM ("
        f"SELECT *, row_number() OVER ({part}ORDER BY _aes DESC, {key}) "
        f"AS _rn FROM ("
        f"SELECT *, ln((CAST({h} AS DOUBLE) + 1.0E0) / {H_MOD}.0E0) "
        f"/ CAST({weight} AS DOUBLE) AS _aes "
        f"FROM ({src_sql}) s "
        f"WHERE ({weight}) IS NOT NULL AND ({weight}) > 0) u) r "
        f"WHERE _rn <= {int(k)}"
    )
