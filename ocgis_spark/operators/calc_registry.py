"""Calculation function registry — the reference's ``FunctionRegistry``
(``/root/reference/src/ocgis/calc/library/register.py:10-30``) re-expressed
as a dict of name → builder. Each builder takes (df, keys, value_col,
**parms) and returns an aggregated DataFrame with the calc's output column.

Includes the core set functions (``calc/library/statistics.py``,
``math.py``, ``thresholds.py``) and ICCLIM-style climate indices
(``contrib/library_icclim.py:286-509``) expressed as compositions of the
engine's primitives:

* SU  — summer days: count of tasmax > 25°C per group
* FD  — frost days: count of tasmin < 0°C per group
* TR  — tropical nights: count of tasmin > 20°C
* DTR — mean diurnal temperature range (needs tasmax+tasmin columns)
* CDD/CWD — max consecutive dry/wet run (gaps-and-islands duration)
* GD4 — growing degree days: sum of max(v-4, 0)

Register custom calcs with :func:`register` (``add_function`` analogue).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import temporal, windows

#: the reference's eval-string ufunc whitelist (constants.py ENABLED_NUMPY_UFUNCS)
ENABLED_SQL_FUNCS = {
    "exp", "log", "log10", "abs", "sqrt", "sin", "cos", "tan", "power",
    "pow", "round", "floor", "ceil", "greatest", "least",
}

_REGISTRY: dict[str, Callable] = {}


def register(name: str):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn
    return deco


def get(name: str) -> Callable:
    try:
        return _REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"unknown calc {name!r}; registered: {sorted(_REGISTRY)}"
        ) from None


def registry() -> dict[str, Callable]:
    return dict(_REGISTRY)


# ---- set functions (statistics.py:374-425, math.py:33-45) ----

def _agg(df, keys, col):
    return df.groupBy(*keys)


for _name, _fn in [
    ("mean", F.avg), ("min", F.min), ("max", F.max), ("sum", F.sum),
    ("std", F.stddev_samp), ("median", F.median),
]:
    def _mk(fn=_fn, name=_name):
        def calc(df: DataFrame, keys: list[str], value: str = "value", **_):
            return _agg(df, keys, value).agg(fn(value).alias(name))
        return calc
    _REGISTRY[_name] = _mk()


@register("between")
def _between(df, keys, value="value", lower=0.0, upper=1.0, **_):
    return temporal.between_count(df, keys, lower, upper, value).withColumnRenamed(
        "between_n", "between"
    )


@register("threshold")
def _threshold(df, keys, value="value", threshold=0.0, operation="gt", **_):
    return temporal.threshold_count(df, keys, threshold, operation, value
                                    ).withColumnRenamed("threshold_n", "threshold")


@register("freq_perc")
def _freq_perc(df, keys, value="value", percentile=0.9, **_):
    return temporal.freq_perc(df, keys, percentile, value).withColumnRenamed(
        "perc", "freq_perc"
    )


@register("trend")
def _trend(df, keys, value="value", x="ts", **_):
    """Per-key OLS trend of value against x. When x is a timestamp column
    it is converted to a day index first (reference users fit trends
    against time)."""
    from . import trend as trend_mod

    xcol = x
    if dict(df.dtypes).get(x, "").startswith("timestamp"):
        xcol = "_trend_x"
        df = df.withColumn(
            xcol, F.floor(F.unix_micros(F.col(x).cast("timestamp"))
                          / F.lit(86400000000.0)).cast("double")
        )
        # center per key: absolute epoch-day indices (~2e4) put
        # n·Σx²−(Σx)² deep into cancellation territory; the slope is
        # shift-invariant and the intercept becomes "value at the key's
        # first day" (documented)
        from pyspark.sql import Window

        df = df.withColumn(
            xcol,
            F.col(xcol) - F.min(xcol).over(Window.partitionBy(*keys)),
        )
    return trend_mod.trend_slope(df, keys, xcol, value)


@register("anomaly")
def _anomaly(df, keys, value="value", group_expr="extract(month from ts)", **_):
    from . import trend as trend_mod

    return trend_mod.anomaly(df, keys, group_expr, value)


@register("hll_distinct")
def _hll_distinct(df, keys, value="value", ts="ts", **_):
    """Approximate per-key distinct count via the mergeable HLL-shape
    register sketch (operators/sketch.py) — the 100-TB COUNT(DISTINCT)
    replacement: per-partition state is at most m rows per key, sketches
    from separate batches merge with a groupBy max. Facade-reachable so
    users never import operators.sketch directly (VERDICT r3 #8)."""
    from . import sketch as sketch_mod

    return sketch_mod.hll_estimate(
        sketch_mod.hll_sketch(df, keys, value), keys
    )


@register("approx_quantile_hist")
def _approx_quantile_hist(
    df, keys, value="value", ts="ts", percentile=0.9,
    lo=0.0, hi=100.0, bins=512, **_,
):
    """Bounded-memory per-key quantile via the fixed-bin histogram sketch
    (operators/sketch.py): ≤ bins rows per key reach the shuffle instead
    of a full-value sort — the scale path for DailyPercentile-style
    percentiles (reference calc/library/statistics.py:138+)."""
    from . import sketch as sketch_mod

    return sketch_mod.histogram_quantile(
        df, keys, value, percentile, lo, hi, bins=bins
    )


@register("cms_topfreq")
def _cms_topfreq(df, keys, value="value", probes=None, **_):
    """Approximate per-probe frequency via the mergeable count-min
    counter sketch (operators/sketch.py cms_*) — the 100-TB replacement
    for a long-tail term-frequency aggregation: per-partition state is at
    most DEPTH·WIDTH rows, counter tables from separate batches merge
    with a groupBy sum. ``probes`` is the list of values to estimate
    (required — CMS answers point queries, it does not enumerate)."""
    from . import sketch as sketch_mod

    if not probes:
        raise ValueError(
            "cms_topfreq needs probes=[...] — a count-min sketch answers "
            "point-frequency queries, it cannot enumerate items"
        )
    if keys:
        raise NotImplementedError(
            "cms_topfreq is registered corpus-global; per-key probe "
            "estimation composes cms_sketch(df, keys, ...) with a keyed "
            "probe join — use operators.sketch directly"
        )
    pdf = df.sparkSession.createDataFrame(
        [(p,) for p in probes], f"{value} string"
    )
    return sketch_mod.cms_estimate(
        sketch_mod.cms_sketch(df, [], value), pdf, value=value
    )


@register("duration")
def _duration(df, keys, value="value", threshold=0.0, operation="gt",
              summary="max", ts="ts", tiebreak=None, **_):
    assert len(keys) == 1, "duration groups per series key"
    return windows.duration(df, keys[0], ts, value, threshold, operation,
                            summary, tiebreak)


# ---- ICCLIM-style indices (library_icclim.py:286-509) ----

@register("icclim_SU")
def _su(df, keys, value="value", threshold=25.0, **_):
    return _agg(df, keys, value).agg(
        F.sum(F.when(F.col(value) > threshold, 1).otherwise(0)).alias("SU")
    )


@register("icclim_FD")
def _fd(df, keys, value="value", threshold=0.0, **_):
    return _agg(df, keys, value).agg(
        F.sum(F.when(F.col(value) < threshold, 1).otherwise(0)).alias("FD")
    )


@register("icclim_TR")
def _tr(df, keys, value="value", threshold=20.0, **_):
    return _agg(df, keys, value).agg(
        F.sum(F.when(F.col(value) > threshold, 1).otherwise(0)).alias("TR")
    )


@register("icclim_DTR")
def _dtr(df, keys, tasmax="tasmax", tasmin="tasmin", **_):
    return df.groupBy(*keys).agg(
        F.avg(F.col(tasmax) - F.col(tasmin)).alias("DTR")
    )


@register("icclim_CDD")
def _cdd(df, keys, value="value", threshold=1.0, ts="ts", tiebreak=None, **_):
    """Max consecutive dry days (precip < threshold)."""
    assert len(keys) == 1
    out = windows.duration(df, keys[0], ts, value, threshold, "lt", "max", tiebreak)
    return out.withColumnRenamed("duration", "CDD")


@register("icclim_CWD")
def _cwd(df, keys, value="value", threshold=1.0, ts="ts", tiebreak=None, **_):
    assert len(keys) == 1
    out = windows.duration(df, keys[0], ts, value, threshold, "gte", "max", tiebreak)
    return out.withColumnRenamed("duration", "CWD")


@register("icclim_GD4")
def _gd4(df, keys, value="value", base=4.0, **_):
    return _agg(df, keys, value).agg(
        F.sum(F.greatest(F.col(value) - base, F.lit(0.0))).alias("GD4")
    )


def percentile_exceedance(
    df: DataFrame,
    keys: list[str],
    basis: DataFrame,
    value: str = "value",
    ts: str = "ts",
    direction: str = "gt",
    out: str = "n_exceed",
) -> DataFrame:
    """Apply a day-of-year percentile basis as a per-doy threshold: count
    rows whose value exceeds (``gt``) / falls below (``lt``) the basis
    percentile for their doy, per group — the missing application step of
    the reference's ``daily_perc`` (``statistics.py:138-352``; ICCLIM
    TX90p/TN90p families, ``contrib/library_icclim.py:286-509``).

    ``basis``: (basis_doy, perc) from :func:`temporal.daily_perc` — ≤365
    rows, broadcast; the join is a narrow broadcast equijoin on doy, so
    the events table is scanned once with no extra shuffle. The probe doy
    wraps with the SAME ``(doy+364)%365+1`` rule the basis uses (identity
    on 1..365, leap-year doy 366 → 1): a raw ``dayofyear`` probe finds no
    basis row for Dec 31 of leap years and the inner join silently drops
    those rows from the count (r4 review finding)."""
    b = basis.select(
        F.col("basis_doy").alias("_doy"), F.round("perc", 6).alias("_perc")
    )
    probe_doy = (F.dayofyear(F.col(ts)).cast("int") + 364) % 365 + 1
    joined = df.join(F.broadcast(b), probe_doy == F.col("_doy"))
    cmp = (
        (F.col(value) > F.col("_perc"))
        if direction == "gt"
        else (F.col(value) < F.col("_perc"))
    )
    return joined.groupBy(*keys).agg(
        F.sum(F.when(cmp, 1).otherwise(0)).alias(out)
    )


def _mk_percentile_index(name: str, percentile: float, direction: str):
    def calc(df, keys, value="value", ts="ts", basis=None, window=5, **_):
        if basis is None:
            basis = temporal.daily_perc(df, percentile, window=window,
                                        ts=ts, value=value)
        return percentile_exceedance(df, keys, basis, value, ts, direction,
                                     out=name.split("_", 1)[1])
    _REGISTRY[name] = calc


# TX90p family: warm/cold day/night/mean exceedance counts vs the doy basis
for _nm, _p, _d in [
    ("icclim_TX90p", 0.9, "gt"), ("icclim_TX10p", 0.1, "lt"),
    ("icclim_TN90p", 0.9, "gt"), ("icclim_TN10p", 0.1, "lt"),
    ("icclim_TG90p", 0.9, "gt"), ("icclim_TG10p", 0.1, "lt"),
]:
    _mk_percentile_index(_nm, _p, _d)


@register("icclim_ID")
def _id(df, keys, value="value", threshold=0.0, **_):
    """Icing days: count of tasmax < 0°C."""
    return _agg(df, keys, value).agg(
        F.sum(F.when(F.col(value) < threshold, 1).otherwise(0)).alias("ID")
    )


@register("icclim_HD17")
def _hd17(df, keys, value="value", base=17.0, **_):
    """Heating degree days: sum of max(17 - tas, 0)."""
    return _agg(df, keys, value).agg(
        F.sum(F.greatest(F.lit(float(base)) - F.col(value), F.lit(0.0))).alias("HD17")
    )


@register("icclim_PRCPTOT")
def _prcptot(df, keys, value="value", wet=1.0, **_):
    """Total precipitation on wet days (v >= 1 mm)."""
    return _agg(df, keys, value).agg(
        F.sum(F.when(F.col(value) >= wet, F.col(value)).otherwise(0.0)).alias("PRCPTOT")
    )


@register("icclim_RR1")
def _rr1(df, keys, value="value", wet=1.0, **_):
    return _agg(df, keys, value).agg(
        F.sum(F.when(F.col(value) >= wet, 1).otherwise(0)).alias("RR1")
    )


@register("icclim_SDII")
def _sdii(df, keys, value="value", wet=1.0, **_):
    """Simple daily intensity: mean precip over wet days."""
    return _agg(df, keys, value).agg(
        F.avg(F.when(F.col(value) >= wet, F.col(value))).alias("SDII")
    )


for _nm, _thr in [("icclim_R10mm", 10.0), ("icclim_R20mm", 20.0)]:
    def _mk_rcount(name=_nm, thr=_thr):
        def calc(df, keys, value="value", **_):
            return _agg(df, keys, value).agg(
                F.sum(F.when(F.col(value) >= thr, 1).otherwise(0)).alias(
                    name.split("_", 1)[1]
                )
            )
        return calc
    _REGISTRY[_nm] = _mk_rcount()


@register("icclim_RX1day")
def _rx1day(df, keys, value="value", **_):
    return _agg(df, keys, value).agg(F.max(value).alias("RX1day"))


@register("icclim_RX5day")
def _rx5day(df, keys, series_key="user_id", value="value", ts="ts",
            tiebreak=None, **_):
    """Max 5-step rolling precipitation total per group (window assigned
    to its CENTER row's group, 'valid' windows only)."""
    mw = windows.moving_window(df, series_key, ts, value, width=5,
                               stat="sum", mode="valid", tiebreak=tiebreak)
    return mw.groupBy(*keys).agg(F.max("mw").alias("RX5day"))


@register("icclim_CSU")
def _csu(df, keys, value="value", threshold=25.0, ts="ts", tiebreak=None, **_):
    """Max consecutive summer days (v > threshold)."""
    assert len(keys) == 1
    out = windows.duration(df, keys[0], ts, value, threshold, "gt", "max", tiebreak)
    return out.withColumnRenamed("duration", "CSU")


@register("icclim_CFD")
def _cfd(df, keys, value="value", threshold=0.0, ts="ts", tiebreak=None, **_):
    """Max consecutive frost days (v < threshold)."""
    assert len(keys) == 1
    out = windows.duration(df, keys[0], ts, value, threshold, "lt", "max", tiebreak)
    return out.withColumnRenamed("duration", "CFD")


@register("icclim_ETR")
def _etr(df, keys, tasmax="tasmax", tasmin="tasmin", **_):
    """Extreme temperature range: max(tasmax) - min(tasmin)."""
    return df.groupBy(*keys).agg(
        (F.max(tasmax) - F.min(tasmin)).alias("ETR")
    )


@register("icclim_vDTR")
def _vdtr(df, keys, series_key="user_id", tasmax="tasmax", tasmin="tasmin",
          ts="ts", tiebreak=None, **_):
    """Mean absolute day-to-day DTR difference."""
    from pyspark.sql import Window as W

    order = [ts, tiebreak] if tiebreak else [ts]
    w = W.partitionBy(series_key).orderBy(*order)
    dtr = F.col(tasmax) - F.col(tasmin)
    diff = F.abs(dtr - F.lag(dtr).over(w))
    return df.withColumn("_d", diff).groupBy(*keys).agg(
        F.avg("_d").alias("vDTR")
    )


# ---- simple statistic indices (TG/TN/TX means, TXx/TXn/TNx/TNn extremes,
# SD snow-depth family — contrib/library_icclim.py:17-46) ----

def _mk_simple(name: str, agg_fn, col_default: str):
    def calc(df, keys, value=None, **_):
        v = value or col_default
        return df.groupBy(*keys).agg(agg_fn(v).alias(name.split("_", 1)[1]))
    _REGISTRY[name] = calc


for _nm, _fn, _col in [
    ("icclim_TG", F.avg, "value"), ("icclim_TN", F.avg, "tasmin"),
    ("icclim_TX", F.avg, "tasmax"),
    ("icclim_TXx", F.max, "tasmax"), ("icclim_TXn", F.min, "tasmax"),
    ("icclim_TNx", F.max, "tasmin"), ("icclim_TNn", F.min, "tasmin"),
    ("icclim_SD", F.avg, "value"),
]:
    _mk_simple(_nm, _fn, _col)


for _nm, _thr in [("icclim_SD1", 1.0), ("icclim_SD5cm", 5.0),
                  ("icclim_SD50cm", 50.0)]:
    def _mk_sdcount(name=_nm, thr=_thr):
        def calc(df, keys, value="value", **_):
            return _agg(df, keys, value).agg(
                F.sum(F.when(F.col(value) >= thr, 1).otherwise(0)).alias(
                    name.split("_", 1)[1]
                )
            )
        return calc
    _REGISTRY[_nm] = _mk_sdcount()


# ---- precip percentile family (R75p/R95p/R99p + pTOT fractions,
# contrib/library_icclim.py:56-61): the threshold is the percentile of
# WET-day precipitation over the base period (flat, not per-doy) ----

def wet_percentile_basis(
    df: DataFrame, keys: list[str], percentile: float,
    value: str = "value", wet: float = 1.0,
) -> DataFrame:
    """Per-group percentile of wet-day (v >= wet) precipitation — the
    R{75,95,99}p base-period threshold. One groupBy over the wet subset;
    at scale the basis is tiny (one row per group) and broadcast back."""
    return df.filter(F.col(value) >= wet).groupBy(*keys).agg(
        F.round(F.percentile(value, F.lit(float(percentile))), 6).alias("_wp")
    )


def _mk_precip_percentile(name: str, percentile: float, tot: bool):
    out = name.split("_", 1)[1]

    def calc(df, keys, value="value", wet=1.0, basis=None, **_):
        b = basis if basis is not None else wet_percentile_basis(
            df, keys, percentile, value, wet
        )
        j = df.join(F.broadcast(b), keys)
        wetc = F.col(value) >= wet
        exceed = wetc & (F.col(value) > F.col("_wp"))
        if tot:
            # R95pTOT: precipitation fraction due to very wet days (%)
            return j.groupBy(*keys).agg(
                F.round(
                    100.0
                    * F.sum(F.when(exceed, F.col(value)).otherwise(0.0))
                    / F.sum(F.when(wetc, F.col(value)).otherwise(0.0)),
                    6,
                ).alias(out)
            )
        return j.groupBy(*keys).agg(
            F.sum(F.when(exceed, 1).otherwise(0)).alias(out)
        )

    _REGISTRY[name] = calc


for _nm, _p, _tot in [
    ("icclim_R75p", 0.75, False), ("icclim_R75pTOT", 0.75, True),
    ("icclim_R95p", 0.95, False), ("icclim_R95pTOT", 0.95, True),
    ("icclim_R99p", 0.99, False), ("icclim_R99pTOT", 0.99, True),
]:
    _mk_precip_percentile(_nm, _p, _tot)


# ---- spell-duration percentile indices (WSDI/CSDI,
# contrib/library_icclim.py:54-55): days in runs of >= min_len consecutive
# days beyond the day-of-year percentile basis ----

def spell_duration_index(
    df: DataFrame,
    keys: list[str],
    basis: DataFrame,
    value: str = "value",
    ts: str = "ts",
    direction: str = "gt",
    min_len: int = 6,
    tiebreak: str | None = None,
    out: str = "WSDI",
) -> DataFrame:
    """WSDI/CSDI shape: broadcast-join the ≤366-row doy basis, flag
    exceedance, gaps-and-islands run-length per series, keep runs of
    ``min_len``+ days, sum their full lengths per group. Composes
    :func:`percentile_exceedance`'s basis join with ``windows.duration``'s
    island logic — one broadcast join + the two window passes islands
    need; nothing new shuffles beyond the per-series sort."""
    assert len(keys) == 1
    series_key = keys[0]
    b = basis.select(
        F.col("basis_doy").alias("_doy"), F.round("perc", 6).alias("_perc")
    )
    # same leap-day wrap as percentile_exceedance: doy 366 probes basis 1
    probe_doy = (F.dayofyear(F.col(ts)).cast("int") + 364) % 365 + 1
    j = df.join(F.broadcast(b), probe_doy == F.col("_doy"))
    cmp = (
        (F.col(value) > F.col("_perc"))
        if direction == "gt"
        else (F.col(value) < F.col("_perc"))
    )
    isl = windows._islands(j, series_key, ts, cmp, tiebreak).filter(
        F.col("_q") == 1
    )
    runs = isl.groupBy(series_key, "_island").agg(
        F.count(F.lit(1)).alias("run_len")
    )
    return (
        runs.filter(F.col("run_len") >= min_len)
        .groupBy(series_key)
        .agg(F.sum("run_len").cast("bigint").alias(out))
    )


def _mk_spell_index(name: str, percentile: float, direction: str):
    out = name.split("_", 1)[1]

    def calc(df, keys, value="value", ts="ts", basis=None, window=5,
             min_len=6, tiebreak=None, **_):
        if basis is None:
            basis = temporal.daily_perc(df, percentile, window=window,
                                        ts=ts, value=value)
        return spell_duration_index(df, keys, basis, value, ts, direction,
                                    min_len, tiebreak, out=out)

    _REGISTRY[name] = calc


_mk_spell_index("icclim_WSDI", 0.9, "gt")
_mk_spell_index("icclim_CSDI", 0.1, "lt")


# ---- multivariate / scalar calcs (math.py:33-45, calc/base.py:771) ----
# These are ROW-LEVEL functions (the reference's AbstractMultivariate /
# univariate non-set functions): they add a column instead of aggregating.
# OcgOperations applies them in place; with calc_grouping set it then
# takes the per-group mean of the computed column (the reference's
# temporal aggregation of multivariate output).

SCALAR_CALCS: dict[str, Callable] = {}


def register_scalar(name: str):
    def deco(fn):
        SCALAR_CALCS[name] = fn
        return fn
    return deco


@register_scalar("divide")
def _divide(df: DataFrame, out: str, arr1: str = "value", arr2: str = "value",
            **_) -> DataFrame:
    return df.withColumn(out, F.col(arr1) / F.col(arr2))


@register_scalar("ln")
def _ln(df: DataFrame, out: str, value: str = "value", **_) -> DataFrame:
    return df.withColumn(out, F.log(F.col(value)))


@register_scalar("exp")
def _exp(df: DataFrame, out: str, value: str = "value", **_) -> DataFrame:
    return df.withColumn(out, F.exp(F.col(value)))


@register_scalar("abs")
def _abs(df: DataFrame, out: str, value: str = "value", **_) -> DataFrame:
    return df.withColumn(out, F.abs(F.col(value)))


def validate_eval_expr(expr: str) -> None:
    """Whitelist validation mirroring the reference's parse check
    (``calc/eval_function.py:60-110``): only known functions allowed."""
    import re

    for fname in re.findall(r"([A-Za-z_][A-Za-z0-9_]*)\s*\(", expr):
        if fname.lower() not in ENABLED_SQL_FUNCS:
            raise ValueError(
                f"function {fname!r} not in the enabled whitelist "
                f"{sorted(ENABLED_SQL_FUNCS)}"
            )
