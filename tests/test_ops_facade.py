"""OcgOperations / RequestDataset / converters — entry-point parity tests
mirroring the reference's operation-level test_simple assertions
(/root/reference/src/ocgis/test/test_simple/test_simple.py)."""

import datetime as dt
import json
import os

import pytest
from pyspark.sql import functions as F

from ocgis_spark.fixtures import GOLDEN_GRID, rect_ring
from ocgis_spark.geo import wkb as WKB
from ocgis_spark.ops import DefinitionValidationError, OcgOperations
from ocgis_spark.request import Field, RequestDataset


@pytest.fixture(scope="module")
def golden_field(spark):
    """make_test_data analogue: 4x4 grid x 61 daily steps from 2000-03-01,
    quadrant values (make_test_data.py:35-120)."""
    rows = []
    t0 = dt.datetime(2000, 3, 1, 12)
    for i in range(61):
        ts = t0 + dt.timedelta(days=i)
        for cy in range(4):
            for cx in range(4):
                north, east = cy >= 2, cx >= 2
                val = (1.0 if (north and not east) else 2.0 if north
                       else 3.0 if not east else 4.0)
                rows.append((ts, cy, cx, -105.0 + cx, 37.0 + cy, val))
    df = spark.createDataFrame(
        rows, "ts timestamp, cell_y int, cell_x int, lon double, lat double, value double"
    )
    return Field(df, {"time": "ts", "x": "lon", "y": "lat", "value": "value"},
                 GOLDEN_GRID)


def test_ops_intersects_golden(spark, golden_field):
    ops = OcgOperations(
        dataset=golden_field,
        geom=(-104.5, 37.5, -102.5, 39.5),
        spatial_operation="intersects",
        abstraction="polygon",
        snippet=True,
    )
    out = ops.execute(spark)
    vals = sorted(r.value for r in out.collect())
    assert vals == [1.0, 2.0, 3.0, 4.0]


def test_ops_clip_aggregate_golden(spark, golden_field):
    ops = OcgOperations(
        dataset=golden_field,
        geom=(-104.0, 38.0, -103.0, 39.0),
        spatial_operation="clip",
        abstraction="polygon",
        aggregate=True,
        snippet=True,
    )
    res = ops.execute(spark).collect()[0]
    assert res["wmean"] == pytest.approx(2.5)
    assert res["union_area"] == pytest.approx(1.0)


def test_ops_calc_monthly_mean(spark, golden_field):
    ops = OcgOperations(
        dataset=golden_field,
        geom=(-104.5, 37.5, -102.5, 39.5),
        abstraction="polygon",
        calc=[{"func": "mean", "name": "mean"}],
        calc_grouping=["year", "month"],
        calc_sample_size=True,
    )
    out = {(r.year, r.month): (r.mean, r.n) for r in ops.execute(spark).collect()}
    # March: 31 days x 4 cells; April: 30 x 4 (61 steps 3/1..4/30)
    assert out[(2000, 3)] == (pytest.approx(2.5), 31 * 4)
    assert out[(2000, 4)] == (pytest.approx(2.5), 30 * 4)


def test_ops_seasonal_grouping(spark, golden_field):
    ops = OcgOperations(
        dataset=golden_field,
        calc=[{"func": "mean", "name": "mean"}],
        calc_grouping=[[3, 4, 5]],
        grid=GOLDEN_GRID,
    )
    rows = ops.execute(spark).collect()
    assert len(rows) == 1  # all 61 steps are MAM 2000
    assert rows[0]["season"] == "MAM" and rows[0]["mean"] == pytest.approx(2.5)


def test_ops_point_buffer_and_nearest(spark, golden_field):
    pt = WKB.point_to_wkb(-104.0, 38.5)
    ops = OcgOperations(
        dataset=golden_field, geom=pt, select_nearest=True, snippet=True,
    )
    out = ops.execute(spark).collect()
    cells = {(r.cell_y, r.cell_x) for r in out}
    assert cells == {(1, 1)}  # golden nearest cell (FIXTURES.md ugid=3)


def test_ops_time_range_and_region(spark, golden_field):
    ops = OcgOperations(
        dataset=golden_field,
        time_range=("2000-03-10 00:00:00", "2000-03-12 23:59:59"),
        grid=GOLDEN_GRID,
    )
    out = ops.execute(spark)
    days = {r.ts.day for r in out.select("ts").distinct().collect()}
    # ±12h bounds widen the selection to 3/9 12:00 (ub 3/10 00:00 >= lo);
    # 3/13 12:00 is excluded (lb 3/13 00:00 > hi)
    assert days == {9, 10, 11, 12}
    ops2 = OcgOperations(
        dataset=golden_field, time_region={"month": [4], "day": [1, 2]},
        grid=GOLDEN_GRID,
    )
    assert ops2.execute(spark).count() == 2 * 16


def test_ops_eval_calc(spark, golden_field):
    ops = OcgOperations(
        dataset=golden_field,
        calc=[{"func": "eval=tas2=value + 2.0"}],
        grid=GOLDEN_GRID, snippet=True,
    )
    out = ops.execute(spark)
    assert out.filter(F.col("tas2") != F.col("value") + 2.0).count() == 0


def test_ops_icclim_su(spark, golden_field):
    ops = OcgOperations(
        dataset=golden_field,
        calc=[{"func": "icclim_SU", "threshold": 2.5}],
        calc_grouping=["month"],
        grid=GOLDEN_GRID,
    )
    out = {r.month: r.SU for r in ops.execute(spark).collect()}
    # values 3,4 exceed 2.5: 8 cells x days
    assert out[3] == 8 * 31 and out[4] == 8 * 30


def test_ops_validation_errors(spark, golden_field):
    with pytest.raises(DefinitionValidationError, match="polygon abstraction"):
        OcgOperations(dataset=golden_field, geom=(0, 0, 1, 1),
                      spatial_operation="clip", abstraction="point")
    with pytest.raises(DefinitionValidationError, match="unknown calc"):
        OcgOperations(dataset=golden_field, calc=[{"func": "nope"}])
    with pytest.raises(DefinitionValidationError, match="requires calc"):
        OcgOperations(dataset=golden_field, calc_grouping=["month"])
    with pytest.raises(DefinitionValidationError, match="output_format"):
        OcgOperations(dataset=golden_field, output_format="netcdf4-python")
    # ADVICE r2: aggregate=True + row-level scalar calc must be rejected
    # at validation (execute() would KeyError after the columns collapse)
    with pytest.raises(DefinitionValidationError, match="scalar calc"):
        OcgOperations(dataset=golden_field, aggregate=True,
                      calc=[{"func": "divide"}])


def test_ops_csv_converter_with_meta(spark, golden_field, tmp_path):
    ops = OcgOperations(
        dataset=golden_field,
        geom=(-104.5, 37.5, -102.5, 39.5),
        abstraction="polygon", snippet=True,
        output_format="csv", prefix="golden_sub", dir_output=str(tmp_path),
    )
    path = ops.execute(spark)
    back = spark.read.option("header", True).csv(path)
    assert back.count() == 4
    meta = json.load(open(path + ".conv_meta.json"))
    assert meta["format"] == "csv" and "value" in meta["columns"]
    assert meta["operations"]["spatial_operation"] == "intersects"


def test_request_dataset_multi_uri_and_variable(spark, tmp_path):
    p1, p2 = str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")
    df = spark.range(5).select(
        F.col("id"), F.lit(1.0).alias("tas"), F.lit(2.0).alias("pr"),
        F.current_timestamp().alias("ts"),
    )
    df.write.parquet(p1)
    df.write.parquet(p2)
    rd = RequestDataset(uri=[p1, p2], variable="tas", rename_variable="tas_r")
    fld = rd.get(spark)
    assert fld.df.count() == 10
    assert "tas_r" in fld.df.columns and "pr" not in fld.df.columns
    assert fld.dimension_map["value"] == "tas_r"


def test_field_slice(spark, golden_field):
    sl = golden_field.get_field_slice({"time": 0, "y": 1})
    rows = sl.df.collect()
    assert len(rows) == 4  # one time step, one row of cells
    assert all(r.lat == 38.0 for r in rows)


def test_ops_level_range(spark, golden_field):
    with_level = Field(
        golden_field.df.withColumn(
            "level", F.when(F.col("cell_x") < 2, 50).otherwise(150)
        ),
        golden_field.dimension_map, golden_field.grid,
    )
    ops = OcgOperations(dataset=with_level, level_range=(0, 100),
                        grid=GOLDEN_GRID, snippet=True)
    out = ops.execute(spark)
    assert out.count() == 8  # west half only
    assert out.filter(F.col("level") > 100).count() == 0


def test_facade_vector_grid_clip(spark):
    """OcgOperations dispatches to the vector-grid subset when grid is a
    VectorGridSpec: clip areas match the direct operator path."""
    import pandas as pd
    from pyspark.sql import functions as F

    from ocgis_spark import fixtures as FX
    from ocgis_spark.operators import vectorgrid as VG
    from ocgis_spark.ops import OcgOperations
    from ocgis_spark.request import Field

    vg = FX.VEC_GRID
    import numpy as np
    pdf = pd.DataFrame({
        "lon": np.linspace(-105.4, -101.6, 300),
        "lat": np.linspace(36.6, 40.4, 300),
        "value": np.arange(300, dtype="f8"),
        "ts": pd.Timestamp("2024-01-01"),
    })
    df = spark.createDataFrame(pdf)
    fld = Field(df, {"time": "ts", "x": "lon", "y": "lat", "value": "value"}, vg)
    rect = (-104.3, 37.6, -102.7, 39.4)
    ops = OcgOperations(dataset=fld, geom=rect, spatial_operation="clip",
                        abstraction="polygon", grid=vg)
    out = ops.execute(spark).toPandas()
    direct = VG.spatial_subset(
        spark, VG.encode_cells(df, vg), vg, [FX.rect_ring(*rect)],
        operation="clip", abstraction="polygon",
    ).toPandas()
    assert len(out) == len(direct) > 0
    assert out["clip_area"].sum() == direct["clip_area"].sum()


def test_facade_vector_grid_select_nearest(spark):
    """select_nearest on a VectorGridSpec: rows collapse to the single
    nearest occupied cell."""
    import numpy as np
    import pandas as pd

    from ocgis_spark import fixtures as FX
    from ocgis_spark.geo import wkb as WKB
    from ocgis_spark.operators import vectorgrid as VG
    from ocgis_spark.ops import OcgOperations
    from ocgis_spark.request import Field

    vg = FX.VEC_GRID
    pdf = pd.DataFrame({
        "lon": np.linspace(-105.4, -101.6, 200),
        "lat": np.linspace(36.6, 40.4, 200),
        "value": np.arange(200, dtype="f8"),
        "ts": pd.Timestamp("2024-01-01"),
    })
    df = VG.encode_cells(spark.createDataFrame(pdf), vg)
    fld = Field(df, {"time": "ts", "x": "lon", "y": "lat", "value": "value"}, vg)
    ops = OcgOperations(
        dataset=fld, geom=bytes(WKB.point_to_wkb(*FX.QUERY_POINT)),
        select_nearest=True, grid=vg,
    )
    out = ops.execute(spark).toPandas()
    assert len(out) > 0
    assert out[["vcx", "vcy"]].drop_duplicates().shape[0] == 1
    # the chosen cell must be the argmin centroid distance among occupied
    occ = df.select("vcx", "vcy").distinct().toPandas()
    qx, qy = FX.QUERY_POINT
    best, bd = None, 1e18
    for r in occ.itertuples():
        minx, miny, maxx, maxy = vg.bounds([int(r.vcy)], [int(r.vcx)])
        cx, cy = (minx[0] + maxx[0]) / 2, (miny[0] + maxy[0]) / 2
        d = ((cx - qx) ** 2 + (cy - qy) ** 2) ** 0.5
        if d < bd or (d == bd and (r.vcy, r.vcx) < best):
            best, bd = (r.vcy, r.vcx), d
    assert (out["vcy"].iloc[0], out["vcx"].iloc[0]) == best


def test_regrid_patch_rejected_at_validation(golden_field):
    with pytest.raises(DefinitionValidationError, match="patch"):
        OcgOperations(
            dataset=golden_field,
            regrid_options={"regrid_method": "patch"},
        )


def test_sketch_calcs_reachable_via_registry(spark):
    # VERDICT r3 #8: hll_distinct / approx_quantile_hist as facade calcs
    from ocgis_spark.operators import calc_registry

    df = spark.range(5000).select(
        (F.col("id") % 2).alias("k"),
        (F.col("id") % 700).cast("double").alias("value"),
    )
    est = {
        r["k"]: r["est_distinct"]
        for r in calc_registry.get("hll_distinct")(df, ["k"]).collect()
    }
    for k in (0, 1):
        assert est[k] == pytest.approx(700 / 2, rel=0.25)
    q = {
        r["k"]: r["quantile"]
        for r in calc_registry.get("approx_quantile_hist")(
            df, ["k"], percentile=0.5, lo=0.0, hi=700.0, bins=700
        ).collect()
    }
    # exact: nearest-rank median of (id % 700) per parity + bin midpoint
    assert q[0] == pytest.approx(342.5) and q[1] == pytest.approx(343.5)


def test_output_crs_accepts_parametric_dict(spark, golden_field):
    """output_crs as a CF parameter dict (r4): the facade routes it
    through the native Snyder closed forms — plan stays pure codegen."""
    lcc = {"proj": "lcc", "lat_1": 30.0, "lat_2": 60.0, "lat_0": 47.5,
           "lon_0": -97.0}
    out = OcgOperations(
        dataset=golden_field, output_crs=lcc, snippet=True
    ).execute(spark)
    assert {"x", "y"} <= set(out.columns)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    rows = out.select("lon", "lat", "x", "y").limit(2).collect()
    from ocgis_spark.operators import crs as crs_ops

    back = crs_ops.transform_crs(
        spark.createDataFrame(rows), lcc, "EPSG:4326",
        lon="x", lat="y", out_x="lon2", out_y="lat2",
    )
    for r in back.collect():
        assert r["lon2"] == pytest.approx(r["lon"], abs=1e-9)
        assert r["lat2"] == pytest.approx(r["lat"], abs=1e-9)


def test_output_crs_parametric_dict_with_datum(spark, golden_field):
    """output_crs dict carrying a file-declared ellipsoid (r4s4): the
    facade reaches the native ELLIPSOIDAL Snyder path — still pure
    codegen, and the output differs from the spherical result (the datum
    actually took effect)."""
    sph = {"proj": "lcc", "lat_1": 30.0, "lat_2": 60.0, "lat_0": 47.5,
           "lon_0": -97.0}
    ell = dict(sph, ellps="WGS84")
    out_e = OcgOperations(
        dataset=golden_field, output_crs=ell, snippet=True
    ).execute(spark)
    plan = out_e._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    out_s = OcgOperations(
        dataset=golden_field, output_crs=sph, snippet=True
    ).execute(spark)
    re, rs = out_e.select("x", "y").first(), out_s.select("x", "y").first()
    assert abs(re["x"] - rs["x"]) > 100.0 or abs(re["y"] - rs["y"]) > 100.0
    from ocgis_spark.operators import crs as crs_ops

    rows = out_e.select("lon", "lat", "x", "y").limit(2).collect()
    back = crs_ops.transform_crs(
        spark.createDataFrame(rows), ell, "EPSG:4326",
        lon="x", lat="y", out_x="lon2", out_y="lat2",
    )
    for r in back.collect():
        assert r["lon2"] == pytest.approx(r["lon"], abs=1e-6)
        assert r["lat2"] == pytest.approx(r["lat"], abs=1e-6)


def test_cms_topfreq_facade_calc(spark):
    """cms_topfreq registry calc: probe-term frequency estimates through
    the facade registry, no operators.sketch import needed."""
    import pytest as _pt

    from ocgis_spark.operators import calc_registry

    df = spark.createDataFrame(
        [(f"t{i % 11}",) for i in range(330)], "value string"
    )
    est = {
        r["value"]: r["est_count"]
        for r in calc_registry.get("cms_topfreq")(
            df, [], probes=["t0", "t5", "missing"]
        ).collect()
    }
    assert est["t0"] >= 30 and est["t5"] >= 30  # one-sided
    assert est["missing"] <= 10
    with _pt.raises(ValueError):
        calc_registry.get("cms_topfreq")(df, [])
    with _pt.raises(NotImplementedError):
        calc_registry.get("cms_topfreq")(df, ["value"], probes=["t0"])


def test_geom_accepts_geojson_dicts(spark, golden_field):
    """geom as GeoJSON dicts (single Polygon, list of Polygons for the
    multi path, Point with square buffer) — parity with the equivalent
    WKB/tuple inputs."""
    import numpy as np

    poly = {"type": "Polygon", "coordinates": [
        [[-104.5, 37.5], [-102.5, 37.5], [-102.5, 39.5],
         [-104.5, 39.5], [-104.5, 37.5]],
    ]}
    out_gj = OcgOperations(dataset=golden_field, geom=poly).execute(spark)
    out_bb = OcgOperations(
        dataset=golden_field, geom=(-104.5, 37.5, -102.5, 39.5)
    ).execute(spark)
    cells = lambda df: sorted(
        (r["cell_y"], r["cell_x"])
        for r in df.select("cell_y", "cell_x").collect()
    )
    assert cells(out_gj) == cells(out_bb) and len(cells(out_gj)) > 0
    # list of dicts -> multi-geometry path with ugid column
    two = OcgOperations(
        dataset=golden_field,
        geom=[poly, {"type": "Polygon", "coordinates": [
            [[-103.0, 39.0], [-102.0, 39.0], [-102.0, 40.0],
             [-103.0, 40.0], [-103.0, 39.0]]]}],
    ).execute(spark)
    assert "ugid" in two.columns and two.count() > 0
    # point buffers like the WKB point path
    pt = {"type": "Point", "coordinates": [-103.4, 38.6]}
    out_pt = OcgOperations(
        dataset=golden_field, geom=pt, abstraction="point"
    ).execute(spark)
    assert out_pt.count() > 0
    # MultiPolygon names the list form
    with pytest.raises(DefinitionValidationError, match="MultiPolygon"):
        OcgOperations(
            dataset=golden_field,
            geom={"type": "MultiPolygon", "coordinates": []},
        ).execute(spark)


# --- round-4 parameter-surface parity (definition.py tail params) -----------


def test_backend_and_optimizations_validation(golden_field):
    with pytest.raises(DefinitionValidationError):
        OcgOperations(dataset=golden_field, backend="dask")
    with pytest.raises(DefinitionValidationError):
        OcgOperations(dataset=golden_field, optimizations={"tgds": {}})
    with pytest.raises(DefinitionValidationError):
        OcgOperations(dataset=golden_field, callback="not-callable")
    with pytest.raises(DefinitionValidationError):
        OcgOperations(dataset=golden_field, file_only=True)  # 'ocgis' fmt
    with pytest.raises(DefinitionValidationError):
        OcgOperations(dataset=golden_field, output_format="csv",
                      output_format_options={"bogus": 1}, dir_output="/tmp")
    with pytest.raises(DefinitionValidationError):
        OcgOperations(dataset=golden_field, geom_uid="STATE")  # no cabinet


def test_callback_progress_monotone(spark, golden_field):
    seen = []
    ops = OcgOperations(
        dataset=golden_field,
        geom=(-104.5, 37.5, -102.5, 39.5),
        abstraction="polygon",
        snippet=True,
        callback=lambda pct, msg: seen.append((pct, msg)),
    )
    ops.execute(spark).collect()
    pcts = [p for p, _ in seen]
    assert pcts == sorted(pcts) and pcts[-1] == 100.0 and len(seen) >= 3


def test_file_only_and_aux_files(spark, golden_field, tmp_path):
    # file_only: structure written, zero data rows
    ops = OcgOperations(
        dataset=golden_field, output_format="csv", file_only=True,
        dir_output=str(tmp_path), prefix="fo",
    )
    path = ops.execute(spark)
    schema = golden_field.df.schema
    assert spark.read.schema(schema).option("header", True).csv(path).count() == 0
    # conv_meta companion present by default...
    assert os.path.exists(path.rstrip("/") + ".conv_meta.json")
    # ...and absent with add_auxiliary_files=False (conv/base.py:208)
    ops2 = OcgOperations(
        dataset=golden_field, output_format="csv",
        add_auxiliary_files=False, dir_output=str(tmp_path), prefix="noaux",
    )
    p2 = ops2.execute(spark)
    assert not os.path.exists(p2.rstrip("/") + ".conv_meta.json")


def test_output_format_options_csv_sep(spark, golden_field, tmp_path):
    ops = OcgOperations(
        dataset=golden_field, output_format="csv",
        output_format_options={"sep": ";"},
        dir_output=str(tmp_path), prefix="sep", snippet=True,
    )
    path = ops.execute(spark)
    back = spark.read.option("header", True).option("sep", ";").csv(path)
    assert back.count() == 16 and set(back.columns) == set(golden_field.df.columns)


def test_spatial_reorder_wrapped_ascending(spark, golden_field):
    """Reference engine.py:555-568: wrapped data presents in ascending-
    longitude order; unwrapped data is untouched (warn + no-op)."""
    ops = OcgOperations(
        dataset=golden_field, snippet=True, spatial_reorder=True,
    )
    lons = [r.lon for r in ops.execute(spark).collect()]
    assert lons == sorted(lons)  # golden lons are negative => wrapped
    # unwrapped (0..360) data: reorder is a no-op, execute still succeeds
    df360 = golden_field.df.withColumn("lon", F.col("lon") + 360.0)
    fld360 = Field(df360, dict(golden_field.dimension_map), golden_field.grid)
    out = OcgOperations(dataset=fld360, snippet=True, spatial_reorder=True)
    assert out.execute(spark).count() == 16


def test_interpolate_spatial_bounds_from_centroids(spark, golden_field):
    """grid omitted + interpolate_spatial_bounds=True: cell bounds
    extrapolate from the lon/lat centroid vectors (engine.py:248-252 /
    set_extrapolated_bounds) and the polygon subset proceeds."""
    fld = Field(golden_field.df, dict(golden_field.dimension_map), None)
    with pytest.raises(DefinitionValidationError):
        OcgOperations(
            dataset=fld, geom=(-104.5, 37.5, -102.5, 39.5),
            abstraction="polygon", snippet=True,
        ).execute(spark)
    out = OcgOperations(
        dataset=fld, geom=(-104.5, 37.5, -102.5, 39.5),
        abstraction="polygon", snippet=True,
        interpolate_spatial_bounds=True,
    ).execute(spark)
    assert sorted(r.value for r in out.collect()) == [1.0, 2.0, 3.0, 4.0]


def test_geom_uid_names_the_selection_attribute(spark, golden_field, tmp_path):
    """geom_uid (definition.py:837-850): select by a custom UID attribute
    in the cabinet table instead of the default 'ugid'."""
    ring = rect_ring(-104.5, 37.5, -103.5, 38.5)
    rows = [(7, bytearray(WKB.polygon_to_wkb([ring])))]
    df = spark.createDataFrame(rows, "STATEFP int, geom_wkb binary")
    uri = str(tmp_path / "geoms")
    df.write.parquet(uri)
    out = OcgOperations(
        dataset=golden_field, geom=uri, geom_uid="STATEFP",
        geom_select_uid=[7], abstraction="polygon", snippet=True,
    ).execute(spark)
    got = out.collect()
    assert {r.ugid for r in got} == {7}
    # (-104.5..-103.5, 37.5..38.5) sits in the south-west quadrant
    assert {r.value for r in got} == {3.0}
    # a UID absent under the custom attribute selects nothing -> raises
    with pytest.raises(DefinitionValidationError):
        OcgOperations(
            dataset=golden_field, geom=uri, geom_uid="STATEFP",
            geom_select_uid=[1], abstraction="polygon",
        ).execute(spark)


def test_format_time_cf_numeric(spark):
    """format_time (definition.py:600-605): CF-numeric requests attach
    decoded calendar parts by default; format_time=False leaves the raw
    numeric axis untouched."""
    import pandas as pd

    pdf = pd.DataFrame({
        "ts": [float(d) for d in range(0, 720, 30)],
        "lon": [-105.0] * 24, "lat": [37.0] * 24,
        "value": [float(v) for v in range(24)],
    })
    src = spark.createDataFrame(pdf)
    uri = "file:///tmp/_cf_numeric_req"
    src.write.mode("overwrite").parquet(uri)
    rd = RequestDataset(
        uri=uri, time_units="days since 2000-01-01",
        time_calendar="360_day",
    )
    out = OcgOperations(dataset=rd, grid=GOLDEN_GRID).execute(spark)
    assert {"cf_year", "cf_month", "cf_day"} <= set(out.columns)
    months = sorted({r.cf_month for r in out.collect()})
    assert months == list(range(1, 13))  # 360_day: 30-day steps hit all 12
    raw = OcgOperations(
        dataset=rd, grid=GOLDEN_GRID, format_time=False
    ).execute(spark)
    assert "cf_year" not in raw.columns and "ts" in raw.columns
