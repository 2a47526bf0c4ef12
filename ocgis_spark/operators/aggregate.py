"""Spatial aggregation — area-weighted statistics per selection geometry.

Reference: ``GeometryVariable.get_unioned``
(``/root/reference/src/ocgis/variable/geom.py:870-1075``): weights =
area / max(area), per-(R,T,Z) masked weighted average, MPI partial+final
merge. Spark's hash aggregate does partial (map-side) + final natively, so
the whole operator is one ``groupBy().agg()`` — no custom merge code.
FP-stability (the reference sorts before summing, ``geom.py:1014-1018``) is
handled by tolerance in the harness, not replicated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def area_weighted_mean(
    df: DataFrame,
    value: str = "value",
    weight: str = "clip_area",
    keys: list[str] | None = None,
) -> DataFrame:
    """sum(v·w)/sum(w) + union area + sample size per key group."""
    gb = df.groupBy(*keys) if keys else df.groupBy()
    return gb.agg(
        (F.sum(F.col(value) * F.col(weight)) / F.sum(weight)).alias("wmean"),
        F.sum(weight).alias("union_area"),
        F.count(F.lit(1)).alias("n"),
    )


def spatial_mean_unweighted(
    df: DataFrame, value: str = "value", keys: list[str] | None = None
) -> DataFrame:
    """Point-abstraction aggregation: weights are 1.0 (``geom.py:307-321``:
    points get unit weight)."""
    gb = df.groupBy(*keys) if keys else df.groupBy()
    return gb.agg(
        F.avg(value).alias("wmean"), F.count(F.lit(1)).alias("n")
    )
