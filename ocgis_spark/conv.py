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
        "csv-shp": convert_csv_shp,
    }


def _write_meta(df: DataFrame, path: str, fmt: str, ops_doc: dict | None,
                extra: dict | None = None) -> str:
    meta = {
        "format": fmt,
        "path": path,
        "schema": df.schema.jsonValue(),
        "columns": df.columns,
        "written_at": time.time(),
        "operations": ops_doc or {},
    }
    if extra:
        meta.update(extra)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    meta_path = path.rstrip("/") + ".conv_meta.json"
    with open(meta_path, "w") as f:
        json.dump(meta, f, indent=2, default=str)
    return meta_path


def convert_ocgis(df: DataFrame, path=None, ops_doc=None, **_kw):
    return df


def convert_parquet(df: DataFrame, path: str, ops_doc=None, aux: bool = True,
                    fmt_options: dict | None = None, **_kw):
    w = df.write.mode("overwrite")
    if fmt_options and "compression" in fmt_options:
        w = w.option("compression", fmt_options["compression"])
    w.parquet(path)
    if aux:
        _write_meta(df, path, "parquet", ops_doc)
    return path


def convert_csv(df: DataFrame, path: str, ops_doc=None, aux: bool = True,
                fmt_options: dict | None = None, **_kw):
    w = df.write.mode("overwrite").option("header", True)
    if fmt_options and "sep" in fmt_options:
        w = w.option("sep", fmt_options["sep"])
    w.csv(path)
    if aux:
        _write_meta(df, path, "csv", ops_doc)
    return path


def convert_meta_only(df: DataFrame, path: str, ops_doc=None, **_kw):
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
                    geom_col: str = "geom", prop_cols: list[str] | None = None,
                    aux: bool = True, **_kw):
    """GeoJSON sink: one Feature per row as line-delimited text (the
    streaming-friendly GeoJSONSeq layout; wrap in a FeatureCollection
    reader-side if needed)."""
    if prop_cols is None:
        prop_cols = [c for c in df.columns if c != geom_col]
    out = df.select(geojson_feature_expr(geom_col, prop_cols).alias("value"))
    out.write.mode("overwrite").text(path)
    if aux:
        _write_meta(df, path, "geojson", ops_doc)
    return path


def convert_shapefile(df: DataFrame, path: str, ops_doc=None,
                      geom_col: str = "geom", prop_cols: list[str] | None = None,
                      aux: bool = True, **_kw):
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
    if aux:
        _write_meta(df, path, "shapefile", ops_doc)
    return path + ".shp"


def convert_csv_shp(df: DataFrame, path: str, ops_doc=None,
                    geom_col: str = "geom", ugid_col: str = "ugid",
                    aux: bool = True, fmt_options: dict | None = None, **_kw):
    """CSV + companion-shapefile sink — the reference's
    CsvShapefileConverter (``conv/csv_.py:18-129``): tabular rows go to
    a CSV keyed by GID; geometry is factored out ONCE per distinct shape
    into ``<path>_shp/<basename>_gid.shp`` (attrs GID [+ UGID]), and,
    when a UGID selection column is present,
    ``<path>_shp/<basename>_ugid.shp`` holds one multi-part record per
    selection id. The conv_meta record links all three artifacts.

    Scale posture: the CSV write stays fully distributed; only the
    DISTINCT geometry set is collected driver-side (selection-sized —
    the same posture as ``convert_shapefile``: a shapefile is a single
    seekable triplet)."""
    from pyspark.sql import functions as F

    from .geo import shp as SHP
    from .geo import wkb as WKB

    if geom_col not in df.columns:
        raise ValueError(
            f"csv-shp needs a {geom_col!r} WKB geometry column "
            "(attach cell/selection geometry before converting)"
        )
    has_ugid = ugid_col in df.columns

    # distinct geometries (+ their selection id when present), collected
    # driver-side; GID = dense id over byte-sorted WKB (deterministic
    # under any partitioning)
    sel = [ugid_col, geom_col] if has_ugid else [geom_col]
    rows = df.select(*sel).distinct().collect()
    by_geom: dict[bytes, dict] = {}
    for r in rows:
        g = bytes(r[geom_col])
        e = by_geom.setdefault(g, {"ugids": set()})
        if has_ugid and r[ugid_col] is not None:
            e["ugids"].add(int(r[ugid_col]))
    wkbs = sorted(by_geom)
    gid_of = {g: i + 1 for i, g in enumerate(wkbs)}

    # companion 1: per-geometry GID shapefile (reference <prefix>_gid.shp)
    base = os.path.basename(path.rstrip("/"))
    shp_dir = path.rstrip("/") + "_shp"
    os.makedirs(shp_dir, exist_ok=True)
    gid_base = os.path.join(shp_dir, base + "_gid")
    attrs = []
    for g in wkbs:
        a = {"GID": gid_of[g]}
        if has_ugid:
            a["UGID"] = min(by_geom[g]["ugids"]) if by_geom[g]["ugids"] else 0
        attrs.append(a)
    SHP.write_shapefile(gid_base, wkbs, attrs)

    # companion 2: per-UGID multi-part selection shapefile
    ugid_base = None
    if has_ugid:
        parts: dict[int, list] = {}
        for g in wkbs:
            for u in by_geom[g]["ugids"]:
                kind, data = WKB.parse_wkb(g)
                polys = [data] if kind == "polygon" else list(data)
                parts.setdefault(u, []).extend(polys)
        ugids = sorted(parts)
        ugid_base = os.path.join(shp_dir, base + "_ugid")
        SHP.write_shapefile(
            ugid_base,
            [WKB.multipolygon_to_wkb(parts[u]) for u in ugids],
            [{"UGID": u} for u in ugids],
        )

    # the CSV: geometry binary replaced by its GID (broadcast equi-join
    # on the WKB bytes — the dim side is the distinct-geometry set)
    spark = df.sparkSession
    gid_df = spark.createDataFrame(
        [(bytearray(g), i) for g, i in gid_of.items()],
        f"{geom_col} binary, GID int",
    )
    keep = [c for c in df.columns if c != geom_col]
    out = df.join(F.broadcast(gid_df), geom_col, "left").select("GID", *keep)
    w = out.write.mode("overwrite").option("header", True)
    if fmt_options and "sep" in fmt_options:
        w = w.option("sep", fmt_options["sep"])
    w.csv(path)

    companions = {"gid_shp": gid_base + ".shp"}
    if ugid_base:
        companions["ugid_shp"] = ugid_base + ".shp"
    if aux:
        _write_meta(out, path, "csv-shp", ops_doc,
                    extra={"companions": companions})
    return path
