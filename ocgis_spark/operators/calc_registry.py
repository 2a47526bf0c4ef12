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

    ``basis``: (basis_doy, perc) from :func:`temporal.daily_perc` — ≤366
    rows, broadcast; the join is a narrow broadcast equijoin on doy, so
    the events table is scanned once with no extra shuffle."""
    b = basis.select(
        F.col("basis_doy").alias("_doy"), F.round("perc", 6).alias("_perc")
    )
    joined = df.join(
        F.broadcast(b), F.dayofyear(F.col(ts)).cast("int") == F.col("_doy")
    )
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
