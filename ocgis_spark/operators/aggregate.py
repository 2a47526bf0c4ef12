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


def union_geometry(
    df: DataFrame,
    keys: list[str] | None = None,
    minx: str = "lon_lb",
    miny: str = "lat_lb",
    maxx: str = "lon_ub",
    maxy: str = "lat_ub",
) -> DataFrame:
    """The union GEOMETRY output of ``get_unioned`` (``geom.py:870-1075``):
    per-key dissolve of the (possibly clip-clamped) cell boxes into WKB via
    the rectilinear edge-cancellation union (``geo/rectunion.py``) —
    no GEOS. Emits ``(keys..., union_wkb, union_area, n_polys, n_rings,
    n_vertices)``; deterministic ring order/start vertex.

    Cells per selection geometry are bounded (a selection's cell set, not
    the corpus), so one Arrow group per key is the same shape the reference
    uses — but distributed across keys by ``applyInPandas``."""
    import pandas as pd

    from ..geo import geometry as G
    from ..geo import rectunion as RU

    keys = keys or []
    src = df if keys else df.withColumn("_g", F.lit(1))
    gkeys = keys or ["_g"]
    key_schema = ", ".join(
        f"{k} {src.schema[k].dataType.simpleString()}" for k in gkeys
    )
    schema = (
        key_schema
        + ", union_wkb binary, union_area double, n_polys int, n_rings int, n_vertices int"
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        polys = RU.union_boxes(
            pdf[minx].to_numpy("f8"), pdf[miny].to_numpy("f8"),
            pdf[maxx].to_numpy("f8"), pdf[maxy].to_numpy("f8"),
        )
        wkb = (
            RU.WKB.polygon_to_wkb(polys[0]) if len(polys) == 1
            else RU.WKB.multipolygon_to_wkb(polys)
        )
        rings = [r for p in polys for r in p]
        row = {k: [pdf[k].iloc[0]] for k in gkeys}
        row.update({
            "union_wkb": [bytearray(wkb)],
            "union_area": [RU.union_area(polys)],
            "n_polys": [len(polys)],
            "n_rings": [len(rings)],
            "n_vertices": [int(sum(len(r) for r in rings))],
        })
        return pd.DataFrame(row)

    out = src.groupBy(*gkeys).applyInPandas(fn, schema)
    return out.drop("_g") if not keys else out


def spatial_mean_unweighted(
    df: DataFrame, value: str = "value", keys: list[str] | None = None
) -> DataFrame:
    """Point-abstraction aggregation: weights are 1.0 (``geom.py:307-321``:
    points get unit weight)."""
    gb = df.groupBy(*keys) if keys else df.groupBy()
    return gb.agg(
        F.avg(value).alias("wmean"), F.count(F.lit(1)).alias("n")
    )
