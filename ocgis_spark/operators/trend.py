"""Per-key linear trend and climatology anomalies.

Climate-analytics staples the reference composes from its calc framework
(`calc/base.py` set functions over temporal groups): a least-squares
trend per spatial cell / series key, and "value minus climatology"
anomalies where the climatology is the long-term mean of the row's
calendar group (reference climatology time bounds:
``src/ocgis/variable/temporal.py:467-692``, month centroid grouping).

Spark-first shape:

* ``trend_slope`` is one hash aggregation — the OLS normal equations are
  sums (n, Σx, Σy, Σxy, Σx²), so Catalyst gets map-side partial
  aggregation and whole-stage codegen; one shuffle on the series key, no
  window, no Python. At 100 TB this is the same plan as any groupBy-sum.
* ``anomaly`` is one window over (key, calendar group) — a single
  exchange; the climatology mean is never materialized as a separate
  join (AVG OVER computes it in the same pass that emits per-row
  anomalies).

Both are dialect-neutral (sums, CASE, extract) so the DuckDB oracles run
the identical formula.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def trend_slope(
    df: DataFrame,
    keys: list[str],
    x: str,
    y: str,
    ndigits: int = 6,
) -> DataFrame:
    """Per-key OLS slope/intercept of y against x.

    slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²); keys with a degenerate
    x-variance (single distinct x) yield NULL slope (0/0) rather than
    raising — matches SQL division semantics in both dialects with ANSI
    off.
    """
    xd = F.col(x).cast("double")
    yd = F.col(y).cast("double")
    agg = df.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("double").alias("_n"),
        F.sum(xd).alias("_sx"),
        F.sum(yd).alias("_sy"),
        F.sum(xd * yd).alias("_sxy"),
        F.sum(xd * xd).alias("_sxx"),
    )
    den = agg["_n"] * agg["_sxx"] - agg["_sx"] * agg["_sx"]
    slope = (agg["_n"] * agg["_sxy"] - agg["_sx"] * agg["_sy"]) / den
    return agg.select(
        *keys,
        F.round(slope, ndigits).alias("slope"),
        F.round((agg["_sy"] - slope * agg["_sx"]) / agg["_n"], ndigits).alias(
            "intercept"
        ),
        agg["_n"].cast("bigint").alias("n_obs"),
    )


def anomaly(
    df: DataFrame,
    keys: list[str],
    group_expr: str,
    v: str,
    ndigits: int = 6,
) -> DataFrame:
    """Append ``clim`` (mean of v over (keys, group_expr) — the
    climatology of the row's calendar group) and ``anom`` (v − clim).

    ``group_expr`` is a SQL expression (e.g. ``extract(hour from ts)`` or
    ``extract(month from ts)``) evaluated in both engines verbatim.
    """
    g = F.expr(group_expr)
    w = Window.partitionBy(*[F.col(k) for k in keys], g)
    clim = F.avg(F.col(v).cast("double")).over(w)
    return df.select(
        "*",
        F.round(clim, ndigits).alias("clim"),
        F.round(F.col(v).cast("double") - clim, ndigits).alias("anom"),
    )
