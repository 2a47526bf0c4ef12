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

from pyspark.sql import DataFrame


def get_converter_map() -> dict[str, object]:
    return {
        "ocgis": convert_ocgis,
        "parquet": convert_parquet,
        "csv": convert_csv,
        "wkb-parquet": convert_parquet,  # WKB column is already binary
        "meta-json": convert_meta_only,
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
