"""GeomCabinet — selection-geometry catalog with server-side filters.

Reference: ``/root/reference/src/ocgis/spatial/geom_cabinet.py:98-276`` —
iterates geometries from vector files with UID selection and an OGR
``SELECT … WHERE`` pushed down to the source. Here the catalog is a parquet
table ``(ugid int, kind string, geom_wkb binary, ...attrs)``; ``select_uid``
and ``select_sql_where`` become Catalyst predicates pushed into the scan,
and geometries decode driver-side (they are few) into ring arrays ready for
``spatial_subset_many``.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import SparkSession

from .geo import shp as SHP
from .geo import wkb as WKB


class GeomCabinet:
    def __init__(self, uri: str):
        self.uri = uri

    def iter_geoms(
        self,
        spark: SparkSession,
        select_uid: list[int] | None = None,
        select_sql_where: str | None = None,
        uid_field: str | None = None,
    ) -> list[tuple[int, list[np.ndarray]]]:
        """Return [(ugid, rings), ...] honoring UID and SQL-where pushdown
        (``geom_cabinet.py:215-276``). Multipolygons yield one entry per
        part with the same ugid (exploded parts keep membership).

        ``uri`` may be a WKB-parquet catalog (the distributed layout) or a
        real ``.shp`` path / shapefile base path — the reference's primary
        selection source (state boundaries etc.), read by the pure-struct
        parser in ``geo.shp`` (round 3; no fiona/GDAL)."""
        base = self.uri[:-4] if self.uri.endswith(".shp") else self.uri
        import os

        if os.path.exists(base + ".shp"):
            out_shp: list[tuple[int, list[np.ndarray]]] = []
            uid_set = (
                {int(u) for u in select_uid} if select_uid is not None else None
            )
            for fid, polys, _attrs in SHP.read_shapefile(base):
                # reference ``geom_uid`` (definition.py:837-850): use the
                # named dbf attribute as the selection UID instead of FID
                if uid_field:
                    if uid_field not in _attrs:
                        raise ValueError(
                            f"geom_uid {uid_field!r} not among shapefile "
                            f"attributes {sorted(_attrs)}"
                        )
                    uid = int(_attrs[uid_field])
                else:
                    uid = fid
                if uid_set is not None and uid not in uid_set:
                    continue
                if select_sql_where:
                    raise ValueError(
                        "select_sql_where needs the WKB-parquet catalog "
                        "layout (attribute pushdown); shapefiles support "
                        "select_uid only"
                    )
                for rings in polys:
                    out_shp.append((uid, rings))
            return out_shp
        df = spark.read.parquet(self.uri)
        ucol = uid_field or "ugid"
        if ucol not in df.columns:
            raise ValueError(
                f"geom_uid {ucol!r} not among geometry-table columns "
                f"{sorted(df.columns)}"
            )
        if select_uid is not None:
            df = df.filter(df[ucol].isin([int(u) for u in select_uid]))
        if select_sql_where:
            df = df.filter(select_sql_where)
        out: list[tuple[int, list[np.ndarray]]] = []
        for row in df.select(df[ucol].alias("ugid"), "geom_wkb").collect():
            kind, data = WKB.parse_wkb(bytes(row["geom_wkb"]))
            if kind == "polygon":
                out.append((int(row["ugid"]), data))
            elif kind == "multipolygon":
                for rings in data:
                    out.append((int(row["ugid"]), rings))
            elif kind == "point":
                x, y = data
                out.append((int(row["ugid"]), [np.array([[x, y]], dtype="f8")]))
            else:  # pragma: no cover
                raise ValueError(f"unsupported geometry kind {kind}")
        return out


def write_geom_table(spark: SparkSession, uri: str, geoms, attrs=None) -> None:
    """Persist [(ugid, kind, rings-or-point)] as a WKB parquet catalog
    (the fiona→shapefile sink analogue, write side)."""
    rows = []
    for i, (ugid, kind, payload) in enumerate(geoms):
        if kind == "point":
            buf = WKB.point_to_wkb(*payload)
        elif kind == "poly":
            buf = WKB.polygon_to_wkb(payload)
        elif kind == "multipoly":
            buf = WKB.multipolygon_to_wkb(payload)
        else:
            raise ValueError(kind)
        a = (attrs or {}).get(ugid, "")
        rows.append((int(ugid), kind, bytearray(buf), a))
    df = spark.createDataFrame(
        rows, "ugid int, kind string, geom_wkb binary, note string"
    )
    df.write.mode("overwrite").parquet(uri)
