"""Multivariate scalar calcs + eval-string expressions.

* ``heat_index`` — the reference's NWS heat-index polynomial over
  (tas °F, rhs %) with conditional masking (tas < 80 or rhs < 40 → null)
  (``/root/reference/src/ocgis/calc/library/index/heat_index.py:6-36``).
  Pure column arithmetic + ``when()`` — whole-stage codegen.
* ``eval_expr`` — the reference's eval-string calc
  (``calc/eval_function.py:9-164``, e.g. ``'tas2=tas+2'``) becomes
  ``F.expr`` so Catalyst parses/folds it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# NWS coefficients (heat_index.py:20-28)
_C = [
    -42.379, 2.04901523, 10.14333127, -0.22475541, -6.83783e-3,
    -5.481717e-2, 1.22874e-3, 8.5282e-4, -1.99e-6,
]


def heat_index(df: DataFrame, tas: str = "tas", rhs: str = "rhs") -> DataFrame:
    t, r = F.col(tas), F.col(rhs)
    hi = (
        F.lit(_C[0]) + _C[1] * t + _C[2] * r + _C[3] * t * r
        + _C[4] * t * t + _C[5] * r * r + _C[6] * t * t * r
        + _C[7] * t * r * r + _C[8] * t * t * r * r
    )
    # conditional mask: defined only for tas >= 80F and rhs >= 40%
    return df.withColumn(
        "heat_index",
        F.round(F.when((t >= 80.0) & (r >= 40.0), hi), 6),
    )


def heat_index_sql(tas: str = "tas", rhs: str = "rhs") -> str:
    """The SAME polynomial as :func:`heat_index`, as a SQL string with
    identical term order — the DuckDB oracle evaluates it bit-identically.
    Coefficients are E-notation DOUBLE literals (fixtures._f): DuckDB
    parses a bare 9-digit decimal as DECIMAL(9,8) and its decimal→double
    conversion can be 1 ulp off the repr double (CLAUDE.md convention)."""
    from ..fixtures import _f

    t, r = tas, rhs
    c = [_f(x) for x in _C]
    hi = (
        f"{c[0]} + {c[1]} * {t} + {c[2]} * {r} + {c[3]} * {t} * {r} "
        f"+ {c[4]} * {t} * {t} + {c[5]} * {r} * {r} + {c[6]} * {t} * {t} * {r} "
        f"+ {c[7]} * {t} * {r} * {r} + {c[8]} * {t} * {t} * {r} * {r}"
    )
    return (
        f"round(CASE WHEN {t} >= 80.0 AND {r} >= 40.0 THEN {hi} END, 6)"
    )


def eval_expr(df: DataFrame, expr: str) -> DataFrame:
    """``'out=tas2=tas+2'``-style calc: ``name=expression`` appended as a
    column; arbitrary Spark-SQL arithmetic (superset of the reference's
    NumPy-ufunc whitelist)."""
    name, _, rhs = expr.partition("=")
    if not rhs:
        raise ValueError(f"eval expr must be 'name=expression', got {expr!r}")
    return df.withColumn(name.strip(), F.expr(rhs))
