"""Geometry scalar functions over WKB binary columns.

The reference's per-geometry scalars (`area`/`weights`
``/root/reference/src/ocgis/variable/geom.py:229-321``, centroid
``geom.py:812-815``, envelope/bounds, square buffer ``geom.py:646-677``
cap_style=3) as Arrow-vectorized pandas UDFs over the engine's WKB codec —
Shapely-free, batch-decoded. Geometry columns are selection-sized, not
corpus-sized, so the codec loop per batch is cheap.

All helpers are column FACTORIES (``wkb_area(col)``), not module-level
``@pandas_udf`` objects: decorating at module scope makes the Python worker
re-create the UDF at unpickle time, when no SparkContext exists to parse
the DDL return type.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from ..geo import geometry as G
from ..geo import wkb as WKB


def wkb_area(geom_col):
    @F.pandas_udf("double")
    def _area(geom: pd.Series) -> pd.Series:
        out = []
        for b in geom:
            kind, data = WKB.parse_wkb(bytes(b))
            if kind == "polygon":
                out.append(G.polygon_area(data))
            elif kind == "multipolygon":
                out.append(sum(G.polygon_area(p) for p in data))
            else:
                out.append(0.0)
        return pd.Series(out)

    return _area(geom_col)


def wkb_centroid(geom_col):
    """Vertex-mean centroid of the outer ring(s) — the Shapely-free
    stand-in for the reference's centroid distance ranking (exact for
    rectangles)."""

    @F.pandas_udf("struct<x: double, y: double>")
    def _centroid(geom: pd.Series) -> pd.DataFrame:
        xs, ys = [], []
        for b in geom:
            kind, data = WKB.parse_wkb(bytes(b))
            if kind == "point":
                xs.append(data[0])
                ys.append(data[1])
                continue
            if kind == "polygon":
                pts = data[0][:-1]
            else:  # multipolygon: pool the outer rings
                pts = np.vstack([p[0][:-1] for p in data])
            xs.append(float(np.mean(pts[:, 0])))
            ys.append(float(np.mean(pts[:, 1])))
        return pd.DataFrame({"x": xs, "y": ys})

    return _centroid(geom_col)


def wkb_bounds(geom_col):
    @F.pandas_udf("struct<minx: double, miny: double, maxx: double, maxy: double>")
    def _bounds(geom: pd.Series) -> pd.DataFrame:
        rows = [WKB.wkb_bounds(bytes(b)) for b in geom]
        return pd.DataFrame(rows, columns=["minx", "miny", "maxx", "maxy"])

    return _bounds(geom_col)


def wkb_buffer_box(geom_col, radius: float):
    """Square-cap buffer (cap_style=3) of a geometry's envelope, returned
    as a new box WKB — the selection-geometry buffering the reference
    applies before point subsetting (``ops/engine.py:515-531``)."""
    r = float(radius)

    @F.pandas_udf("binary")
    def _buf(geom: pd.Series) -> pd.Series:
        out = []
        for b in geom:
            minx, miny, maxx, maxy = WKB.wkb_bounds(bytes(b))
            out.append(
                bytearray(WKB.box_to_wkb(minx - r, miny - r, maxx + r, maxy + r))
            )
        return pd.Series(out)

    return _buf(geom_col)
