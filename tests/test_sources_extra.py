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


class _V:
    def __init__(self, **attrs):
        self.__dict__.update(attrs)
        self.ndim = attrs.get("ndim", 1)


def test_netcdf_ingest_axis_discovery():
    """CF axis discovery (driver/nc.py:373-440) works without netCDF4:
    attribute crawl over a stub variables mapping (ocgis_spark.ncmodel,
    which jobs/ingest_netcdf.py delegates to)."""
    from ocgis_spark import ncmodel

    variables = {
        "time": _V(units="days since 1950-01-01", calendar="noleap"),
        "plev": _V(standard_name="air_pressure"),
        "rlat": _V(units="degrees_north"),
        "rlon": _V(units="degrees_east"),
        "tas": _V(ndim=3),
    }
    dmap = ncmodel.discover_dimension_map(variables)
    assert dmap == {"time": "time", "level": "plev", "y": "rlat", "x": "rlon"}
    assert ncmodel.pick_data_variable(variables, dmap) == "tas"

    variables2 = {  # axis attributes win
        "t": _V(axis="T"), "lat": _V(axis="Y"), "lon": _V(axis="X"),
        "pr": _V(ndim=3),
    }
    assert ncmodel.discover_dimension_map(variables2) == {
        "time": "t", "y": "lat", "x": "lon"
    }


def test_netcdf_melt_densify_roundtrip(spark):
    """The ingest melt and the export densify are exact inverses on a
    synthetic (time, lat, lon) hyperslab — exercising the full job logic
    (driver/nc.py:344-440 / conv/nc.py semantics) without netCDF4."""
    import datetime as dt

    import numpy as np

    from ocgis_spark import ncmodel

    rng = np.random.default_rng(3)
    nt, ny, nx = 7, 4, 5
    dense = rng.normal(size=(nt, ny, nx))
    dense[2, 1, 3] = np.nan  # masked cell survives the round trip as NaN
    times = [dt.datetime(2024, 3, 1) + dt.timedelta(days=i) for i in range(nt)]
    lats = np.linspace(30.0, 33.0, ny)
    lons = np.linspace(-100.0, -96.0, nx)

    # melt in 2 chunks (chunk_rows forces step < nt)
    chunks = list(ncmodel.melt_slabs(
        times, lats, lons, lambda t0, t1: dense[t0:t1],
        "tas", "synthetic.nc", chunk_rows=3 * ny * nx,
    ))
    assert len(chunks) == 3  # 7 steps at 3 per chunk
    import pandas as pd

    long = pd.concat(chunks, ignore_index=True)
    assert len(long) == nt * ny * nx
    assert set(long["variable"]) == {"tas"}

    df = spark.createDataFrame(long)
    t2, la2, lo2 = ncmodel.coordinate_vectors(df)
    assert list(la2) == list(lats) and list(lo2) == list(lons)
    assert len(t2) == nt

    back = np.full((nt, ny, nx), np.nan)
    seen = []
    for ti, ts, slab in ncmodel.densify_slabs(df, t2, la2, lo2):
        back[ti] = slab
        seen.append(ti)
    assert seen == list(range(nt))  # time order, one slab each
    np.testing.assert_array_equal(
        np.isnan(back), np.isnan(dense)
    )
    np.testing.assert_allclose(
        np.nan_to_num(back), np.nan_to_num(dense), rtol=0, atol=0
    )


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
