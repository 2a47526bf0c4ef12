"""Temporal subsetting, grouping, and set functions.

Reference semantics:

* bounds-aware ``time_range`` (a row is kept if its [lb, ub] interval
  overlaps the query range) — ``Variable.get_between``
  (``/root/reference/src/ocgis/variable/base.py:1150-1237``);
* ``time_region`` calendar-part filter — ``temporal.py:380-445``;
* ``calc_grouping`` temporal group-by with representative datetimes
  (month centroid = day 16, ``constants.py:114-118``) and seasonal groups
  with the December→next-DJF year shift — ``temporal.py:227-271,467-692``;
* set functions mean/min/max/sum/std/median + between/threshold counts —
  ``calc/library/statistics.py:374-425``, ``thresholds.py:6-60``.

All of it is plain groupBy/agg — Catalyst gives partial aggregation,
whole-stage codegen and (with AQE) skew handling for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def with_time_bounds(df: DataFrame, ts: str = "ts", hours: int = 12) -> DataFrame:
    """Synthesize ±h bounds (ocgis time bounds, FIXTURES.md §3)."""
    return df.withColumn(
        "ts_lb", F.col(ts) - F.expr(f"INTERVAL {hours} HOURS")
    ).withColumn("ts_ub", F.col(ts) + F.expr(f"INTERVAL {hours} HOURS"))


def time_range(df: DataFrame, lo: str, hi: str) -> DataFrame:
    """Bounds-aware inclusive range: keep rows whose [ts_lb, ts_ub] overlaps
    [lo, hi] (``base.py:1150-1237``)."""
    return df.filter((F.col("ts_ub") >= F.lit(lo)) & (F.col("ts_lb") <= F.lit(hi)))


def time_region(
    df: DataFrame, months: list[int] | None = None, years: list[int] | None = None,
    days: list[int] | None = None, ts: str = "ts",
) -> DataFrame:
    """Conjunction over parts, disjunction within (``temporal.py:380-445``)."""
    out = df
    if months:
        out = out.filter(F.month(ts).isin(months))
    if years:
        out = out.filter(F.year(ts).isin(years))
    if days:
        out = out.filter(F.dayofmonth(ts).isin(days))
    return out


def daily_perc(
    df: DataFrame, percentile: float = 0.9, window: int = 5,
    ts: str = "ts", value: str = "value",
) -> DataFrame:
    """ICCLIM-style day-of-year percentile basis with a ±window over years
    (``statistics.py:138-352``): the basis for doy d pools every year's
    values with doy in [d-w, d+w]. Expressed as an explode of day offsets
    (each row contributes to 2w+1 doy bins) + per-bin exact percentile —
    one shuffle, no self-join."""
    assert window % 2 == 1
    half = window // 2
    contrib = df.select(
        F.explode(
            F.sequence(F.lit(-half), F.lit(half))
        ).alias("off"),
        F.dayofyear(ts).alias("doy"),
        F.col(value).alias("v"),
    ).select(
        # wrap around the year boundary like the reference's doy arithmetic
        ((F.col("doy") + F.col("off") + 364) % 365 + 1).alias("basis_doy"),
        "v",
    )
    return contrib.groupBy("basis_doy").agg(
        F.percentile("v", F.lit(percentile)).alias("perc")
    )


def time_subset_func(df: DataFrame, fn, ts: str = "ts") -> DataFrame:
    """Arbitrary Python predicate over datetimes — the reference's
    ``time_subset_func`` (``temporal.py:345-378``): ``fn`` receives a
    pandas Series of datetimes and returns a boolean mask. Arrow-batched;
    use only when the predicate is genuinely not SQL-expressible."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # no inline type hints: `from __future__ import annotations` stringifies
    # them and pyspark's hint resolver can't see the local pd import
    def _pred(s):
        return pd.Series(fn(s))

    return df.filter(pandas_udf(_pred, "boolean")(F.col(ts)))


def season_expr(ts: str = "ts"):
    """Season label + season year (Dec counts toward the NEXT year's DJF —
    ``temporal.py:467-597`` year-split rule)."""
    m = F.month(ts)
    label = (
        F.when(m.isin(3, 4, 5), "MAM")
        .when(m.isin(6, 7, 8), "JJA")
        .when(m.isin(9, 10, 11), "SON")
        .otherwise("DJF")
    )
    syear = F.when(m == 12, F.year(ts) + 1).otherwise(F.year(ts))
    return label, syear


def group_month(df: DataFrame, ts: str = "ts", value: str = "value") -> DataFrame:
    """calc_grouping ['year','month'] with representative datetime on the
    month centroid day 16 (``constants.py:114-118``) + climatology bounds."""
    return (
        df.groupBy(F.year(ts).alias("year"), F.month(ts).alias("month"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(ts).alias("lb"),
            F.max(ts).alias("ub"),
        )
        .withColumn(
            "repr_time",
            F.make_timestamp("year", "month", F.lit(16), F.lit(0), F.lit(0), F.lit(0)),
        )
    )


def group_season(df: DataFrame, ts: str = "ts", value: str = "value") -> DataFrame:
    label, syear = season_expr(ts)
    return (
        df.withColumn("season", label)
        .withColumn("season_year", syear)
        .groupBy("season", "season_year")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg(value).alias("mean_value"),
        )
    )


def set_functions(
    df: DataFrame, keys: list[str], value: str = "value"
) -> DataFrame:
    """The reference's set-function battery over one grouping
    (``statistics.py:374-425``, ``math.py:33-45``) + sample size
    (``calc/base.py:275-288``)."""
    return df.groupBy(*keys).agg(
        F.avg(value).alias("mean"),
        F.min(value).alias("min"),
        F.max(value).alias("max"),
        F.sum(value).alias("sum"),
        F.stddev_samp(value).alias("std"),
        F.median(value).alias("median"),
        F.count(value).alias("n"),
    )


def between_count(
    df: DataFrame, keys: list[str], lo: float, hi: float, value: str = "value"
) -> DataFrame:
    """``Between`` threshold count (``thresholds.py:6-24``)."""
    return df.groupBy(*keys).agg(
        F.sum(
            F.when((F.col(value) >= lo) & (F.col(value) <= hi), 1).otherwise(0)
        ).alias("between_n")
    )


def threshold_count(
    df: DataFrame, keys: list[str], threshold: float, operation: str = "gt",
    value: str = "value",
) -> DataFrame:
    """``Threshold`` count gt/gte/lt/lte (``thresholds.py:27-60``)."""
    col = F.col(value)
    cond = {
        "gt": col > threshold, "gte": col >= threshold,
        "lt": col < threshold, "lte": col <= threshold,
    }[operation]
    return df.groupBy(*keys).agg(
        F.sum(F.when(cond, 1).otherwise(0)).alias("threshold_n")
    )


def freq_perc(
    df: DataFrame, keys: list[str], percentile: float, value: str = "value"
) -> DataFrame:
    """Exact per-group percentile (``statistics.py:355-371``) — Spark's
    ``percentile`` matches DuckDB's ``quantile_cont`` interpolation."""
    return df.groupBy(*keys).agg(
        F.percentile(value, F.lit(percentile)).alias("perc")
    )
