"""Shapefile sink round-trip: write .shp/.shx/.dbf with the pure-struct
writer and re-read them with an INDEPENDENT minimal parser (this file),
validating headers, offsets, ring orientation, coordinates, and dbf
attributes — the fiona sink (reference conv/fiona_.py) without GDAL."""

import struct

import numpy as np
import pytest

from ocgis_spark.geo import shp as SHP
from ocgis_spark.geo import wkb as WKB
from ocgis_spark.geo import geometry as G


def _read_shp(path):
    buf = open(path, "rb").read()
    code, flen_words = struct.unpack(">i", buf[:4])[0], struct.unpack(">i", buf[24:28])[0]
    version, shape_type = struct.unpack("<2i", buf[28:36])
    assert code == 9994 and version == 1000
    assert flen_words * 2 == len(buf)
    recs, off = [], 100
    while off < len(buf):
        recno, clen = struct.unpack(">2i", buf[off:off + 8])
        off += 8
        st, minx, miny, maxx, maxy = struct.unpack("<i4d", buf[off:off + 36])
        nparts, npts = struct.unpack("<2i", buf[off + 36:off + 44])
        parts = struct.unpack(f"<{nparts}i", buf[off + 44:off + 44 + 4 * nparts])
        pts = np.frombuffer(
            buf, "<f8", count=2 * npts, offset=off + 44 + 4 * nparts
        ).reshape(npts, 2)
        recs.append((recno, st, (minx, miny, maxx, maxy), parts, pts.copy()))
        off += clen * 2
    return shape_type, recs


def _read_shx(path):
    buf = open(path, "rb").read()
    out = []
    for off in range(100, len(buf), 8):
        out.append(struct.unpack(">2i", buf[off:off + 8]))
    return out


def _read_dbf(path):
    buf = open(path, "rb").read()
    nrec, hdr, rsz = struct.unpack("<IHH", buf[4:12])
    fields, off = [], 32
    while buf[off] != 0x0D:
        name = buf[off:off + 11].rstrip(b"\x00").decode()
        ftype = chr(buf[off + 11])
        flen = buf[off + 16]
        fields.append((name, ftype, flen))
        off += 32
    rows = []
    for i in range(nrec):
        r = buf[hdr + i * rsz: hdr + (i + 1) * rsz]
        assert r[:1] == b" "
        vals, p = {}, 1
        for name, ftype, flen in fields:
            raw = r[p:p + flen].decode().strip()
            vals[name] = float(raw) if ftype == "N" and raw else raw
            p += flen
        rows.append(vals)
    return fields, rows


@pytest.fixture()
def tri_and_holed(tmp_path):
    tri = WKB.polygon_to_wkb([np.array(
        [[0.0, 0.0], [4.0, 0.0], [2.0, 3.0], [0.0, 0.0]])])
    holed = WKB.polygon_to_wkb([
        np.array([[10.0, 10.0], [20.0, 10.0], [20.0, 20.0], [10.0, 20.0],
                  [10.0, 10.0]]),
        np.array([[13.0, 13.0], [17.0, 13.0], [17.0, 17.0], [13.0, 17.0],
                  [13.0, 13.0]]),
    ])
    base = str(tmp_path / "cells")
    SHP.write_shapefile(
        base, [tri, holed],
        attrs=[{"ugid": 1, "name": "tri"}, {"ugid": 2, "name": "holed"}],
        fields=[("ugid", "N", 11, 0), ("name", "C", 16, 0)],
    )
    return base


def test_shp_structure_and_orientation(tri_and_holed):
    shape_type, recs = _read_shp(tri_and_holed + ".shp")
    assert shape_type == SHP.SHP_POLYGON
    assert [r[0] for r in recs] == [1, 2]
    # record 2: two rings, outer CW, hole CCW
    _, st, bbox, parts, pts = recs[1]
    assert st == SHP.SHP_POLYGON and len(parts) == 2
    assert bbox == (10.0, 10.0, 20.0, 20.0)
    outer = pts[parts[0]:parts[1]]
    hole = pts[parts[1]:]
    assert G.ring_area(outer) < 0  # CW
    assert G.ring_area(hole) > 0   # CCW
    assert abs(G.ring_area(outer)) == pytest.approx(100.0)
    assert abs(G.ring_area(hole)) == pytest.approx(16.0)


def test_shx_offsets_match(tri_and_holed):
    shape_type, recs = _read_shp(tri_and_holed + ".shp")
    idx = _read_shx(tri_and_holed + ".shx")
    assert len(idx) == 2
    # offsets must point at each record header in the .shp
    buf = open(tri_and_holed + ".shp", "rb").read()
    for i, (off_words, clen) in enumerate(idx):
        recno = struct.unpack(">i", buf[off_words * 2: off_words * 2 + 4])[0]
        assert recno == i + 1


def test_dbf_attrs(tri_and_holed):
    fields, rows = _read_dbf(tri_and_holed + ".dbf")
    assert [f[0] for f in fields] == ["ugid", "name"]
    assert rows[0]["ugid"] == 1.0 and rows[0]["name"] == "tri"
    assert rows[1]["ugid"] == 2.0 and rows[1]["name"] == "holed"


def test_converter_end_to_end(spark, tmp_path):
    """Spark df with WKB geoms -> 'shapefile' converter -> parse back."""
    from ocgis_spark import conv

    g1 = WKB.polygon_to_wkb([np.array(
        [[-105.0, 37.0], [-104.0, 37.0], [-104.0, 38.0], [-105.0, 38.0],
         [-105.0, 37.0]])])
    df = spark.createDataFrame(
        [(1, bytearray(g1), 2.5)], "ugid int, geom binary, wmean double"
    )
    out = conv.get_converter_map()["shapefile"](
        df, str(tmp_path / "zones"), geom_col="geom"
    )
    assert out.endswith(".shp")
    _, recs = _read_shp(out)
    assert len(recs) == 1
    fields, rows = _read_dbf(str(tmp_path / "zones.dbf"))
    assert rows[0]["ugid"] == 1.0 and rows[0]["wmean"] == 2.5
    # multipolygon WKB also writes (two parts, one record)
    mp = WKB.multipolygon_to_wkb([
        [np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 0.0]])],
        [np.array([[5.0, 5.0], [6.0, 5.0], [6.0, 6.0], [5.0, 5.0]])],
    ])
    SHP.write_shapefile(str(tmp_path / "mp"), [mp])
    _, recs2 = _read_shp(str(tmp_path / "mp.shp"))
    assert len(recs2) == 1 and len(recs2[0][3]) == 2


def test_read_shapefile_roundtrip(tri_and_holed):
    """writer -> reader round trip: geometry (incl. hole nesting and WKB
    re-orientation) and dbf attributes identical."""
    feats = SHP.read_shapefile(tri_and_holed)
    assert len(feats) == 2
    fid, polys, attrs = feats[1]
    assert fid == 2 and attrs["name"] == "holed"
    assert len(polys) == 1 and len(polys[0]) == 2
    outer, hole = polys[0]
    assert G.ring_area(outer) > 0   # WKB convention: outer CCW
    assert G.ring_area(hole) < 0    # hole CW
    assert abs(G.ring_area(outer)) == pytest.approx(100.0)
    assert abs(G.ring_area(hole)) == pytest.approx(16.0)
    # fid prefers the UGID-style numeric attribute
    assert feats[0][0] == 1


def test_geom_cabinet_reads_shapefile(spark, tri_and_holed):
    """GeomCabinet consumes a real .shp selection source (the reference's
    state-boundaries pattern) with UID pushdown."""
    from ocgis_spark.geom_cabinet import GeomCabinet

    cab = GeomCabinet(tri_and_holed + ".shp")
    geoms = cab.iter_geoms(spark)
    assert {u for u, _ in geoms} == {1, 2}
    only2 = cab.iter_geoms(spark, select_uid=[2])
    assert {u for u, _ in only2} == {2}
    # rings usable by the subset kernels: area of the holed polygon
    rings = only2[0][1]
    assert G.polygon_area(rings) == pytest.approx(84.0)


def test_ops_facade_shapefile_selection(spark, tmp_path):
    """End to end: OcgOperations(geom='<...>.shp') subsets by a shapefile
    selection — the reference's canonical invocation shape."""
    import datetime as dt
    from pyspark.sql import functions as F
    from ocgis_spark.fixtures import GOLDEN_GRID, rect_ring
    from ocgis_spark.ops import OcgOperations
    from ocgis_spark.request import Field

    g = GOLDEN_GRID
    sel = WKB.polygon_to_wkb([rect_ring(
        g.lon0, g.lat0, g.lon0 + 2 * g.res, g.lat0 + 2 * g.res)])
    base = str(tmp_path / "sel")
    SHP.write_shapefile(base, [sel], attrs=[{"UGID": 7}],
                        fields=[("UGID", "N", 11, 0)])
    rows = []
    for cy in range(4):
        for cx in range(4):
            rows.append((dt.datetime(2024, 1, 1), cy, cx,
                         g.lon0 + (cx + 0.5) * g.res,
                         g.lat0 + (cy + 0.5) * g.res, 1.0))
    df = spark.createDataFrame(
        rows, "ts timestamp, cell_y int, cell_x int, lon double, "
              "lat double, value double")
    fld = Field(df, {"time": "ts", "x": "lon", "y": "lat", "value": "value"}, g)
    out = OcgOperations(dataset=fld, geom=base + ".shp",
                        abstraction="polygon").execute(spark)
    assert out.count() == 4  # the 2x2 block
    assert {r["ugid"] for r in out.select("ugid").distinct().collect()} == {7}


def test_prj_sidecar(tri_and_holed):
    prj = open(tri_and_holed + ".prj").read()
    assert prj.startswith('GEOGCS["GCS_WGS_1984"')


def test_ops_facade_shapefile_agg_selection(spark, tmp_path):
    """geom='<...>.shp' + agg_selection=True unions the cabinet
    selections (rows deduped, no ugid column)."""
    import datetime as dt
    from ocgis_spark.fixtures import GOLDEN_GRID, rect_ring
    from ocgis_spark.ops import OcgOperations
    from ocgis_spark.request import Field

    g = GOLDEN_GRID
    s1 = WKB.polygon_to_wkb([rect_ring(
        g.lon0, g.lat0, g.lon0 + 2 * g.res, g.lat0 + 2 * g.res)])
    s2 = WKB.polygon_to_wkb([rect_ring(
        g.lon0 + g.res, g.lat0 + g.res, g.lon0 + 3 * g.res,
        g.lat0 + 3 * g.res)])
    base = str(tmp_path / "sel2")
    SHP.write_shapefile(base, [s1, s2],
                        attrs=[{"UGID": 1}, {"UGID": 2}],
                        fields=[("UGID", "N", 11, 0)])
    rows = [(dt.datetime(2024, 1, 1), cy, cx,
             g.lon0 + (cx + 0.5) * g.res, g.lat0 + (cy + 0.5) * g.res, 1.0)
            for cy in range(4) for cx in range(4)]
    df = spark.createDataFrame(
        rows, "ts timestamp, cell_y int, cell_x int, lon double, "
              "lat double, value double")
    fld = Field(df, {"time": "ts", "x": "lon", "y": "lat", "value": "value"}, g)
    out = OcgOperations(dataset=fld, geom=base + ".shp", agg_selection=True,
                        abstraction="polygon").execute(spark)
    # union of the two overlapping 2x2 blocks = 7 distinct cells, deduped
    assert "ugid" not in out.columns
    assert out.count() == 7


def test_csv_shp_companion_roundtrip(spark, tmp_path):
    """csv-shp sink (CsvShapefileConverter parity, conv/csv_.py:18-129):
    CSV keyed by GID + companion _gid.shp/_ugid.shp that read back
    through the independent parser with matching geometry + attrs."""
    import csv as csvmod
    import glob

    from ocgis_spark import conv
    from ocgis_spark.geo import shp as SHP
    from ocgis_spark.geo import wkb as WKB

    boxes = {1: (0.0, 0.0, 1.0, 1.0), 2: (2.0, 0.0, 3.0, 1.5)}
    rows = []
    for ugid, b in boxes.items():
        for t in range(3):
            rows.append((ugid, f"2000-01-0{t+1}", float(ugid * 10 + t),
                         bytearray(WKB.box_to_wkb(*b))))
    df = spark.createDataFrame(
        rows, "ugid int, ts string, value double, geom binary"
    )
    out = str(tmp_path / "csvshp")
    conv.convert_csv_shp(df, out)

    # CSV: GID column replaces the geometry binary; 6 data rows
    got = []
    for f in glob.glob(out + "/part-*.csv"):
        with open(f) as fh:
            got += list(csvmod.DictReader(fh))
    assert len(got) == 6
    assert set(got[0]) == {"GID", "ugid", "ts", "value"}
    gid_by_ugid = {int(r["ugid"]): int(r["GID"]) for r in got}
    assert len(set(gid_by_ugid.values())) == 2

    # companion GID shapefile: one record per distinct geometry, UGID attr
    recs = SHP.read_shapefile(str(tmp_path / "csvshp_shp" / "csvshp_gid"))
    assert len(recs) == 2
    for _, polys, attrs in recs:
        u, g = int(attrs["UGID"]), int(attrs["GID"])
        assert gid_by_ugid[u] == g
        ring = polys[0][0]
        minx, miny, maxx, maxy = boxes[u]
        assert ring[:, 0].min() == minx and ring[:, 0].max() == maxx
        assert ring[:, 1].min() == miny and ring[:, 1].max() == maxy

    # companion UGID shapefile: one (multi-part) record per selection id
    urecs = SHP.read_shapefile(str(tmp_path / "csvshp_shp" / "csvshp_ugid"))
    assert sorted(int(a["UGID"]) for _, _, a in urecs) == [1, 2]

    # conv_meta links the companions
    import json

    meta = json.load(open(out + ".conv_meta.json"))
    assert meta["format"] == "csv-shp"
    assert meta["companions"]["gid_shp"].endswith("csvshp_gid.shp")
    assert meta["companions"]["ugid_shp"].endswith("csvshp_ugid.shp")


def test_csv_shp_via_facade(spark, tmp_path):
    """output_format='csv-shp' through OcgOperations (converter map)."""
    from ocgis_spark.conv import get_converter_map

    assert "csv-shp" in get_converter_map()
