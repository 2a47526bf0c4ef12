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


# ---------------------------------------------------------------------------
# Arbitrary seasonal month-sets + 'year'/'unique' flags — the reference's
# general calc_grouping seasonal path (``variable/temporal.py:467-597``
# [_get_grouping_other_ seasonal branch], ``:661-692``
# [_get_grouping_seasonal_unique_], ``:918-931`` [get_is_interannual],
# ``:1008-1090`` [get_time_regions interannual year split]). The repo's
# canonical DJF/MAM/JJA/SON fast path stays in season_expr; these handle
# any disjoint month partition, e.g. [[11, 12, 1], [2, 3, 4]].
# ---------------------------------------------------------------------------

_CANONICAL_SEASONS = {
    frozenset([12, 1, 2]): "DJF", frozenset([3, 4, 5]): "MAM",
    frozenset([6, 7, 8]): "JJA", frozenset([9, 10, 11]): "SON",
}


def season_label_of(months) -> str:
    """Stable label for one month set: the canonical name when the set is
    a canonical season, else the months joined in the given order."""
    return _CANONICAL_SEASONS.get(
        frozenset(int(m) for m in months)
    ) or "-".join(str(int(m)) for m in months)


def _validate_month_sets(month_sets) -> list[list[int]]:
    sets = [[int(m) for m in s] for s in month_sets]
    seen: set[int] = set()
    for s in sets:
        if not s:
            raise ValueError("empty season month set")
        for m in s:
            if not 1 <= m <= 12:
                raise ValueError(f"month {m} outside 1..12")
            if m in seen:
                raise ValueError(
                    f"month {m} appears in more than one season set "
                    "(seasons must partition months)"
                )
            seen.add(m)
    return sets


def is_interannual(months) -> bool:
    """True when a season crosses the year boundary
    (``get_is_interannual``, temporal.py:918-931): contains 12 AND 1."""
    s = {int(m) for m in months}
    return 12 in s and 1 in s


def _head_months(months) -> list[int]:
    """The January-side run of an interannual season — the months that
    belong to the FOLLOWING calendar year (get_time_regions splits the
    descending-sorted season at the first gap > 1, temporal.py:1038-1049:
    e.g. [11, 12, 1, 2] → year-Y part [11, 12], year-Y+1 part [1, 2])."""
    head: list[int] = []
    for m in sorted({int(x) for x in months}):
        if m == (head[-1] + 1 if head else 1):
            head.append(m)
        else:
            break
    return head


def custom_season_expr(
    month_sets, ts: str = "ts", year_mode: str | None = None
):
    """(label, year) Columns for an arbitrary disjoint month partition.

    ``year_mode``:

    * ``None`` — no year column (reference plain seasonal grouping pools
      all years per season, temporal.py:552-570);
    * ``'calendar'`` — the row's calendar year (the reference ``'year'``
      flag matches rows on their own year with NO wrap shift,
      temporal.py:556-563);
    * ``'start'`` — the season's starting year (the ``'unique'`` flag's
      interannual split: Dec-Y + Jan/Feb-(Y+1) form the group keyed by
      Y, temporal.py:1028-1049), i.e. January-side months map to
      ``year - 1``.
    """
    sets = _validate_month_sets(month_sets)
    m = F.month(ts)
    label = F.lit(None).cast("string")
    for s in sets:
        label = F.when(m.isin(*s), F.lit(season_label_of(s))).otherwise(label)
    if year_mode is None:
        return label, None
    if year_mode == "calendar":
        return label, F.year(ts)
    if year_mode != "start":
        raise ValueError(f"year_mode {year_mode!r}: None|'calendar'|'start'")
    shift = F.lit(0)
    for s in sets:
        if is_interannual(s):
            head = _head_months(s)
            if head:
                shift = F.when(m.isin(*head), F.lit(-1)).otherwise(shift)
    return label, F.year(ts) + shift


def custom_season_sql(
    month_sets, ts: str = "ts", year_mode: str | None = None
) -> tuple[str, str | None]:
    """Dialect-neutral SQL twin of :func:`custom_season_expr` (the DuckDB
    oracle runs the identical strings)."""
    sets = _validate_month_sets(month_sets)
    cases = " ".join(
        f"WHEN month({ts}) IN ({', '.join(str(m) for m in s)}) "
        f"THEN '{season_label_of(s)}'"
        for s in sets
    )
    label = f"(CASE {cases} END)"
    if year_mode is None:
        return label, None
    if year_mode == "calendar":
        return label, f"CAST(year({ts}) AS INT)"
    shifts = []
    for s in sets:
        if is_interannual(s):
            head = _head_months(s)
            if head:
                shifts.append(
                    f"WHEN month({ts}) IN ({', '.join(map(str, head))}) "
                    f"THEN -1"
                )
    shift = f"(CASE {' '.join(shifts)} ELSE 0 END)" if shifts else "0"
    return label, f"(CAST(year({ts}) AS INT) + {shift})"


def interannual_need_expr(sets):
    """CASE mapping a 'season' label column to the distinct-month count an
    INTERANNUAL (year-wrapping) season needs to be complete; NULL for
    non-wrapping seasons (no completeness rule). The single home of the
    reference's 'unique'-flag incomplete-group drop
    (``src/ocgis/variable/temporal.py:661-692``) — shared by the
    aggregate form here and the facade's pre-calc window form
    (ops.py _with_grouping_keys)."""
    need = F.lit(None).cast("int")
    for s in sets:
        if is_interannual(s):
            need = F.when(
                F.col("season") == season_label_of(s), F.lit(len(list(s)))
            ).otherwise(need)
    return need


def group_custom_seasons(
    df: DataFrame,
    month_sets,
    ts: str = "ts",
    value: str = "value",
    year_flag: str | None = None,
) -> DataFrame:
    """Seasonal aggregation over an arbitrary month partition — count +
    mean per group, mirroring :func:`group_season`.

    ``year_flag``: ``None`` pools years per season; ``'year'`` groups by
    (season, calendar year); ``'unique'`` groups by (season, season
    start-year) with the interannual Dec→Jan year split AND drops
    incomplete interannual groups (a wrapped season at the data boundary
    missing its December-side or January-side months — the reference
    skips those via get_time_regions' IndexError path,
    temporal.py:1049-1057; we require every month of the season present,
    which coincides on contiguous data and is exactly expressible
    relationally)."""
    sets = _validate_month_sets(month_sets)
    mode = {None: None, "year": "calendar", "unique": "start"}[year_flag]
    label, syear = custom_season_expr(sets, ts, year_mode=mode)
    out = df.withColumn("season", label).filter(F.col("season").isNotNull())
    keys = ["season"]
    if syear is not None:
        out = out.withColumn("season_year", syear)
        keys.append("season_year")
    agg = out.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(value).alias("mean_value"),
        F.countDistinct(F.month(ts)).alias("_nm"),
    )
    if year_flag == "unique":
        need = interannual_need_expr(sets)
        agg = agg.filter(need.isNull() | (F.col("_nm") == need))
    return agg.drop("_nm")
