"""Window and sequence calcs over per-key time series.

Reference semantics:

* ``moving_window`` centered rolling stat, 'valid' mode trims edges —
  ``/root/reference/src/ocgis/calc/library/statistics.py:12-135``;
* ``convolve_1d`` along time — ``math.py:48-109``;
* ``duration`` longest qualifying run per group — gaps-and-islands
  (``calc/library/index/duration.py:10-95``);
* ``freq_duration`` run-length histogram (``duration.py:98-153``);
* ``freezethaw`` cumulative-excursion transition count
  (``freeze_thaw.py:9-110``) → relational windowed prefix sum (the
  "sequential" state is a cumulative sum; no applyInPandas).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str = "ts",
    right_ts: str | None = None,
    value_cols: list[str] | None = None,
    tolerance: float | None = None,
) -> DataFrame:
    """AS-OF join: attach to every left row the MOST RECENT right row with
    ``right.ts <= left.ts`` per key (calibration lookups, slowly-changing
    dimensions). Spark has no native as-of join; the scalable shape is the
    union-and-carry trick, NOT a range join:

    * union both sides tagged by origin (right rows carry their payload,
      left rows null);
    * one shuffle on the key, sort by (ts, origin) inside the window;
    * ``last(payload, ignorenulls=True)`` over the unbounded-preceding
      frame carries the latest right payload forward onto each left row.

    One exchange total, no row explosion — a range join would blow up as
    |left|×|matching-interval| and a per-key collect would not scale past
    one executor. Ties (equal timestamps) resolve to the right row
    (origin sorts right-before-left), matching DuckDB/pandas
    ``merge_asof(allow_exact_matches=True)``.

    ``tolerance``: optional max staleness in the ts unit — matches older
    than ``left.ts - tolerance`` become nulls (pandas merge_asof
    semantics). Returns left columns + the right value columns (null when
    no right row precedes).

    Scale note: the carry is a per-key ordered window, so one KEY's rows
    sort within one task — the usual window skew consideration. For a
    pathologically hot key, pre-carry per (key, time-bucket) and stitch
    bucket boundaries (two-phase carry); unnecessary for keyed telemetry
    with bounded per-key cardinality."""
    rts = right_ts or ts
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (key, rts)]
    lt = left.withColumn("_origin", F.lit(1))
    for c in value_cols:
        lt = lt.withColumn(f"_r_{c}", F.lit(None).cast(right.schema[c].dataType))
    lt = lt.withColumn("_rts", F.lit(None).cast(right.schema[rts].dataType))
    rt = right.select(
        F.col(key),
        F.col(rts).alias(ts),
        F.lit(0).alias("_origin"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
        F.col(rts).alias("_rts"),
    )
    for c in left.columns:
        if c not in (key, ts):
            rt = rt.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    u = lt.unionByName(rt.select(lt.columns))
    w = (
        Window.partitionBy(key)
        .orderBy(ts, "_origin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        *[c for c in left.columns],
        "_origin",
        *[F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_c_{c}")
          for c in value_cols],
        F.last("_rts", ignorenulls=True).over(w).alias("_c_ts"),
    ).filter(F.col("_origin") == 1)
    stale = (
        F.col("_c_ts").isNull()
        | (F.col(ts).cast("double") - F.col("_c_ts").cast("double")
           > F.lit(float(tolerance)))
        if tolerance is not None else F.lit(False)
    )
    out = carried.select(
        *left.columns,
        *[F.when(~stale, F.col(f"_c_{c}")).alias(c) for c in value_cols],
    )
    return out


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    lo: float,
    hi: float,
    right_ts: str | None = None,
) -> DataFrame:
    """Range (interval) join: pair every left row with the right rows
    whose time falls in ``[left.ts + lo, left.ts + hi]`` per key
    (``ts`` numeric — epoch micros/seconds; convert timestamps first).

    Naive theta-joins on the inequality degenerate to per-key cross
    products. The scalable shape is BUCKETED: right rows hash to
    ``floor(ts / w)`` with ``w = hi - lo``; each left row's window spans
    at most TWO such buckets, exploded as an array — so the join is an
    equi-join on (key, bucket) with the exact BETWEEN as a post-filter.
    Join fan-out is |matches| + O(|left|), never |left|x|right|, and the
    equi-keys shuffle/broadcast like any other join (AQE handles skew).

    Returns left columns + right columns suffixed ``_r`` (right ``key``
    dropped, right ts as ``{ts}_r``)."""
    if hi <= lo:
        raise ValueError("interval_join needs hi > lo")
    rts = right_ts or ts
    w = float(hi - lo)
    rt = right.select(
        F.col(key),
        F.col(rts).alias(f"{ts}_r"),
        *[F.col(c).alias(f"{c}_r") for c in right.columns if c not in (key, rts)],
    ).withColumn("_b", F.floor(F.col(f"{ts}_r") / F.lit(w)).cast("long"))
    lo_b = F.floor((F.col(ts) + F.lit(float(lo))) / F.lit(w)).cast("long")
    hi_b = F.floor((F.col(ts) + F.lit(float(hi))) / F.lit(w)).cast("long")
    lt = left.withColumn("_b", F.explode(F.sequence(lo_b, hi_b)))
    out = lt.join(rt, [key, "_b"]).filter(
        F.col(f"{ts}_r").between(
            F.col(ts) + F.lit(float(lo)), F.col(ts) + F.lit(float(hi))
        )
    )
    return out.drop("_b")


def moving_window(
    df: DataFrame, key: str, ts: str, value: str, width: int = 5,
    stat: str = "avg", mode: str = "valid", tiebreak: str | None = None,
) -> DataFrame:
    """Centered rolling stat of odd width per key, ordered by time.
    'valid' mode keeps only full windows (``statistics.py:60-75``).
    ``tiebreak`` makes ordering deterministic under equal timestamps."""
    assert width % 2 == 1, "width must be odd (statistics.py:30)"
    half = width // 2
    order = [ts, tiebreak] if tiebreak else [ts]
    w = Window.partitionBy(key).orderBy(*order).rowsBetween(-half, half)
    fn = {"avg": F.avg, "min": F.min, "max": F.max, "sum": F.sum,
          "std": F.stddev_samp, "median": F.median}[stat]
    out = df.withColumn("mw", fn(value).over(w)).withColumn(
        "mw_n", F.count(value).over(w)
    )
    if mode == "valid":
        out = out.filter(F.col("mw_n") == width)
    return out.drop("mw_n")


def convolve_1d(
    df: DataFrame, key: str, ts: str, value: str, weights: list[float],
    tiebreak: str | None = None,
) -> DataFrame:
    """Centered 1-D convolution via lag/lead dot product — stays in
    whole-stage codegen (no UDF). Odd-length kernels only; edges trimmed
    ('valid')."""
    assert len(weights) % 2 == 1
    half = len(weights) // 2
    order = [ts, tiebreak] if tiebreak else [ts]
    w = Window.partitionBy(key).orderBy(*order)
    acc = None
    for i, wt in enumerate(weights):
        off = i - half
        col = F.lag(value, -off).over(w) if off != 0 else F.col(value)
        term = col * F.lit(float(wt))
        acc = term if acc is None else acc + term
    cnt = F.count(value).over(w.rowsBetween(-half, half))
    return df.withColumn("conv", acc).withColumn("_n", cnt).filter(
        F.col("_n") == len(weights)
    ).drop("_n")


def _islands(df: DataFrame, key: str, ts: str, cond, tiebreak: str | None = None) -> DataFrame:
    """Tag qualifying rows with island ids (gaps-and-islands)."""
    order = [ts, tiebreak] if tiebreak else [ts]
    w = Window.partitionBy(key).orderBy(*order)
    flagged = df.withColumn("_q", F.when(cond, 1).otherwise(0))
    return (
        flagged.withColumn("_rn", F.row_number().over(w))
        .withColumn(
            "_rq",
            F.row_number().over(
                Window.partitionBy(key, "_q").orderBy(*order)
            ),
        )
        .withColumn("_island", F.col("_rn") - F.col("_rq"))
    )


def duration(
    df: DataFrame, key: str, ts: str, value: str, threshold: float,
    operation: str = "gt", summary: str = "max", tiebreak: str | None = None,
) -> DataFrame:
    """Longest (or mean/...) consecutive-run length where value meets the
    threshold, per key (``duration.py:10-95``)."""
    col = F.col(value)
    cond = {"gt": col > threshold, "gte": col >= threshold,
            "lt": col < threshold, "lte": col <= threshold}[operation]
    isl = _islands(df, key, ts, cond, tiebreak).filter(F.col("_q") == 1)
    runs = isl.groupBy(key, "_island").agg(F.count(F.lit(1)).alias("run_len"))
    fn = {"max": F.max, "mean": F.avg, "min": F.min}[summary]
    return runs.groupBy(key).agg(fn("run_len").cast("double").alias("duration"))


def freq_duration(
    df: DataFrame, key: str, ts: str, value: str, threshold: float,
    operation: str = "gt", tiebreak: str | None = None,
) -> DataFrame:
    """Histogram of run lengths per key (``duration.py:98-153`` structured
    (duration, count) records → plain rows here)."""
    col = F.col(value)
    cond = {"gt": col > threshold, "gte": col >= threshold,
            "lt": col < threshold, "lte": col <= threshold}[operation]
    isl = _islands(df, key, ts, cond, tiebreak).filter(F.col("_q") == 1)
    runs = isl.groupBy(key, "_island").agg(F.count(F.lit(1)).alias("run_len"))
    return runs.groupBy(key, "run_len").agg(F.count(F.lit(1)).alias("cnt"))


def freezethaw(
    df: DataFrame,
    key: str,
    ts: str,
    value: str,
    threshold: float = 15.0,
    tiebreak: str | None = None,
) -> DataFrame:
    """Freeze/thaw-style transition count per series
    (``freeze_thaw.py:9-110``): count sign changes of the running state
    once the cumulative excursion Σ(v − threshold) crosses zero, zeros
    carrying the previous state.

    The "sequential" scan is really a windowed prefix sum, so the whole
    operator is relational: cumulative-sum window → sign (NULL at exactly
    zero) → gaps-and-islands fill (``last ignorenulls``) → lag compare →
    grouped count. No applyInPandas (the r1–r3 version): per-series
    groups had to fit one worker's memory, while window frames spill and
    stay JVM-side. ``tiebreak`` orders equal timestamps deterministically
    (required for an exact oracle)."""
    order = [F.col(ts)] + ([F.col(tiebreak)] if tiebreak else [])
    wcum = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wlag = Window.partitionBy(key).orderBy(*order)
    cols = [key, ts] + ([tiebreak] if tiebreak else []) + [value]
    d = df.select(*dict.fromkeys(cols)).withColumn(
        "_acc", F.sum(F.col(value) - F.lit(threshold)).over(wcum)
    )
    sg = F.when(F.col("_acc") > 0, F.lit(1)).when(F.col("_acc") < 0, F.lit(-1))
    d = d.withColumn("_st", F.last(sg, ignorenulls=True).over(wcum))
    d = d.withColumn("_prev", F.lag("_st").over(wlag))
    flip = F.when(
        F.col("_prev").isNotNull()
        & F.col("_st").isNotNull()
        & (F.col("_prev") != F.col("_st")),
        1,
    ).otherwise(0)
    return d.groupBy(key).agg(
        F.sum(flip).cast("bigint").alias("transitions")
    )
