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
