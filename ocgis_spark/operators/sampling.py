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

from pyspark.sql import Column, DataFrame
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
