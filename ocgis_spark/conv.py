"""Output converters — the reference's converter registry
(``/root/reference/src/ocgis/conv/base.py:263-291``) as a format→writer
dispatch. Every file-writing converter also emits a ``conv_meta`` JSON
lineage record next to the data (the reference's metadata converter,
``conv/meta.py:1-104``, folded into every sink as the north rule's
lineage-row requirement).

Formats: 'ocgis' (return the DataFrame — ``conv/numpy_.py``), 'parquet',
'csv' (``conv/csv_.py``), 'wkb-parquet' (vector sink: geometry as WKB
binary column — the GeoParquet-style analogue of the fiona shapefile sink,
``conv/fiona_.py``), 'meta-json' (metadata only).
"""

from __future__ import annotations

import json
import os
import time

import pandas as pd  # noqa: F401 (pandas_udf type-hint resolution)
from pyspark.sql import DataFrame


def get_converter_map() -> dict[str, object]:
    return {
        "ocgis": convert_ocgis,
        "parquet": convert_parquet,
        "csv": convert_csv,
        "wkb-parquet": convert_parquet,  # WKB column is already binary
        "meta-json": convert_meta_only,
        "geojson": convert_geojson,
        "shapefile": convert_shapefile,
    }


def _write_meta(df: DataFrame, path: str, fmt: str, ops_doc: dict | None) -> str:
    meta = {
        "format": fmt,
        "path": path,
        "schema": df.schema.jsonValue(),
        "columns": df.columns,
        "written_at": time.time(),
        "operations": ops_doc or {},
    }
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    meta_path = path.rstrip("/") + ".conv_meta.json"
    with open(meta_path, "w") as f:
        json.dump(meta, f, indent=2, default=str)
    return meta_path


def convert_ocgis(df: DataFrame, path=None, ops_doc=None):
    return df


def convert_parquet(df: DataFrame, path: str, ops_doc=None):
    df.write.mode("overwrite").parquet(path)
    _write_meta(df, path, "parquet", ops_doc)
    return path


def convert_csv(df: DataFrame, path: str, ops_doc=None):
    df.write.mode("overwrite").option("header", True).csv(path)
    _write_meta(df, path, "csv", ops_doc)
    return path


def convert_meta_only(df: DataFrame, path: str, ops_doc=None):
    return _write_meta(df, path, "meta-json", ops_doc)


def geojson_feature_expr(geom_col: str = "geom", prop_cols: list[str] | None = None):
    """Column factory: GeoJSON Feature string from a WKB geometry column +
    property columns — the fiona/GeoJSON sink (``conv/fiona_.py``) without
    GDAL: pure string assembly in an Arrow pandas UDF (geometry) + JVM
    ``to_json`` (properties)."""
    from pyspark.sql import functions as F

    from .geo import wkb as WKB

    @F.pandas_udf("string")
    def geom_json(wkb_s: pd.Series) -> pd.Series:
        import json as _json

        out = []
        for b in wkb_s:
            if b is None:
                out.append(None)
                continue
            kind, data = WKB.parse_wkb(bytes(b))
            if kind == "point":
                gj = {"type": "Point", "coordinates": [data[0], data[1]]}
            elif kind == "polygon":
                gj = {"type": "Polygon",
                      "coordinates": [[[x, y] for x, y in r] for r in data]}
            else:
                gj = {"type": "MultiPolygon",
                      "coordinates": [[[[x, y] for x, y in r] for r in p]
                                      for p in data]}
            out.append(_json.dumps(gj, separators=(",", ":")))
        return pd.Series(out)

    props = F.to_json(F.struct(*[F.col(c) for c in (prop_cols or [])]))
    return F.concat(
        F.lit('{"type":"Feature","geometry":'),
        geom_json(F.col(geom_col)),
        F.lit(',"properties":'),
        props,
        F.lit("}"),
    )


def convert_geojson(df: DataFrame, path: str, ops_doc=None,
                    geom_col: str = "geom", prop_cols: list[str] | None = None):
    """GeoJSON sink: one Feature per row as line-delimited text (the
    streaming-friendly GeoJSONSeq layout; wrap in a FeatureCollection
    reader-side if needed)."""
    if prop_cols is None:
        prop_cols = [c for c in df.columns if c != geom_col]
    out = df.select(geojson_feature_expr(geom_col, prop_cols).alias("value"))
    out.write.mode("overwrite").text(path)
    return _write_meta(df, path, "geojson", ops_doc)


def convert_shapefile(df: DataFrame, path: str, ops_doc=None,
                      geom_col: str = "geom", prop_cols: list[str] | None = None):
    """ESRI shapefile sink (.shp/.shx/.dbf) — real file triplet via the
    pure-struct writer (``geo/shp.py``; reference ``conv/fiona_.py``).
    A shapefile is a single seekable triplet, so rows are collected
    driver-side (same posture as the NetCDF export); use 'wkb-parquet'
    for the distributed vector sink. ``path`` is the base path without
    extension."""
    from .geo import shp as SHP

    if prop_cols is None:
        prop_cols = [c for c in df.columns if c != geom_col]
    rows = df.select(geom_col, *prop_cols).collect()
    geoms = [bytes(r[geom_col]) for r in rows]
    attrs = [{c: r[c] for c in prop_cols} for r in rows]
    SHP.write_shapefile(path, geoms, attrs)
    _write_meta(df, path, "shapefile", ops_doc)
    return path + ".shp"
