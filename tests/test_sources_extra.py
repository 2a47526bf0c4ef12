"""CSV driver and time_subset_func coverage."""

import datetime as dt

from pyspark.sql import functions as F

from ocgis_spark.operators import temporal
from ocgis_spark.request import RequestDataset


def test_csv_driver_roundtrip(spark, tmp_path):
    p = str(tmp_path / "csvsrc")
    df = spark.createDataFrame(
        [(i, float(i) * 1.5) for i in range(20)], "id bigint, value double"
    )
    df.write.option("header", True).mode("overwrite").csv(p)
    rd = RequestDataset(uri=p, driver="csv")
    fld = rd.get(spark)
    assert fld.df.count() == 20
    assert dict(fld.df.dtypes)["value"] == "double"  # inferSchema


def test_time_subset_func(spark):
    rows = [(i, dt.datetime(2000, 3, 1) + dt.timedelta(days=i)) for i in range(30)]
    df = spark.createDataFrame(rows, "id int, ts timestamp")
    # arbitrary python predicate: keep Mondays (weekday 0)
    out = temporal.time_subset_func(df, lambda s: s.dt.weekday == 0)
    days = sorted(r.ts.day for r in out.collect())
    # March 2000 Mondays: 6, 13, 20, 27
    assert days == [6, 13, 20, 27]


def test_netcdf_ingest_axis_discovery():
    """jobs/ingest_netcdf.py CF axis discovery (driver/nc.py:373-440) works
    without netCDF4: attribute crawl over a stub dataset."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "ingest_netcdf",
        os.path.join(os.path.dirname(__file__), "..", "jobs", "ingest_netcdf.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    class V:
        def __init__(self, **attrs):
            self.__dict__.update(attrs)
            self.ndim = attrs.get("ndim", 1)

    class DS:
        variables = {
            "time": V(units="days since 1950-01-01", calendar="noleap"),
            "plev": V(standard_name="air_pressure"),
            "rlat": V(units="degrees_north"),
            "rlon": V(units="degrees_east"),
            "tas": V(ndim=3),
        }

    dmap = mod.discover_dimension_map(DS())
    assert dmap == {"time": "time", "level": "plev", "y": "rlat", "x": "rlon"}

    class DS2:  # axis attributes win
        variables = {
            "t": V(axis="T"), "lat": V(axis="Y"), "lon": V(axis="X"),
            "pr": V(ndim=3),
        }

    assert mod.discover_dimension_map(DS2()) == {
        "time": "t", "y": "lat", "x": "lon"
    }


def test_geojson_sink_roundtrip(spark, tmp_path):
    """GeoJSON sink: WKB polygons + properties -> line-delimited Features
    that json-parse back to the same geometry."""
    import json

    import pandas as pd

    from ocgis_spark import conv
    from ocgis_spark.geo import wkb as WKB

    pdf = pd.DataFrame({
        "ugid": [1, 2],
        "geom": [bytearray(WKB.box_to_wkb(0, 0, 1, 1)),
                 bytearray(WKB.point_to_wkb(2.5, 3.5))],
        "name": ["box", "pt"],
    })
    df = spark.createDataFrame(pdf)
    out = str(tmp_path / "gj")
    conv.convert_geojson(df, out, geom_col="geom")
    lines = []
    import glob
    for f in glob.glob(out + "/part-*"):
        lines += [ln for ln in open(f).read().splitlines() if ln]
    feats = sorted((json.loads(ln) for ln in lines),
                   key=lambda f: f["properties"]["ugid"])
    assert feats[0]["geometry"]["type"] == "Polygon"
    assert feats[0]["geometry"]["coordinates"][0][0] == [0.0, 0.0]
    assert feats[0]["properties"] == {"ugid": 1, "name": "box"}
    assert feats[1]["geometry"] == {"type": "Point", "coordinates": [2.5, 3.5]}


def test_from_ugrid_loader(spark):
    """UGRID node + face_node tables -> mesh; subset matches expectations."""
    import numpy as np
    import pandas as pd

    from ocgis_spark.fixtures import rect_ring
    from ocgis_spark.geo import unstructured as U

    nodes = spark.createDataFrame(pd.DataFrame({
        "node_id": [0, 1, 2, 3, 4, 5],
        "x": [0.0, 1.0, 2.0, 0.0, 1.0, 2.0],
        "y": [0.0, 0.0, 0.0, 1.0, 1.0, 1.0],
    }))
    faces = spark.createDataFrame(pd.DataFrame({
        "face_id": [0, 1],
        "node_ids": [[0, 1, 4, 3], [1, 2, 5, 4]],
    }))
    elems, nd = U.from_ugrid(nodes, faces)
    out = U.subset_elements(
        elems, nd, [rect_ring(-0.5, -0.5, 0.9, 1.5)], keep_touches=False
    ).toPandas()
    assert list(out.elem_id) == [0]  # only the left quad strictly overlaps
