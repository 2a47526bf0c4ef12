"""Round-3 OcgOperations parameter parity: conform_units_to,
time_subset_func, spatial_wrapping / vector_wrap, output_crs, slice_,
GeomCabinet geom + geom_select_uid, calc_raw, regrid_destination —
the reference kwargs (ops/core.py __init__) the facade lacked."""

import datetime as dt
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from ocgis_spark.fixtures import GOLDEN_GRID, rect_ring
from ocgis_spark.ops import DefinitionValidationError, OcgOperations
from ocgis_spark.request import Field


@pytest.fixture(scope="module")
def field(spark):
    """4x4 golden grid, 3 daily steps, value = 273.15 + cell pattern."""
    g = GOLDEN_GRID
    rows = []
    for d in range(3):
        ts = dt.datetime(2024, 1, 1) + dt.timedelta(days=d)
        for cy in range(4):
            for cx in range(4):
                val = 273.15 + 10.0 * cy + cx
                lon = g.lon0 + (cx + 0.5) * g.res
                lat = g.lat0 + (cy + 0.5) * g.res
                rows.append((ts, cy, cx, lon, lat, val))
    df = spark.createDataFrame(
        rows,
        "ts timestamp, cell_y int, cell_x int, lon double, lat double, "
        "value double",
    )
    return Field(df, {"time": "ts", "x": "lon", "y": "lat", "value": "value"},
                 g)


def test_conform_units_to_string_and_tuple(spark, field):
    out = OcgOperations(dataset=field, conform_units_to="K->C").execute(spark)
    v = out.filter((F.col("cell_y") == 0) & (F.col("cell_x") == 0)) \
        .select("value").first()[0]
    assert v == pytest.approx(0.0)
    out2 = OcgOperations(dataset=field,
                         conform_units_to=(2.0, 1.0)).execute(spark)
    v2 = out2.filter((F.col("cell_y") == 0) & (F.col("cell_x") == 0)) \
        .select("value").first()[0]
    assert v2 == pytest.approx(273.15 * 2 + 1)
    with pytest.raises(DefinitionValidationError, match="conform_units_to"):
        OcgOperations(dataset=field, conform_units_to="K->banana")


def test_time_subset_func(spark, field):
    out = OcgOperations(
        dataset=field,
        time_subset_func=lambda s: s.dt.day == 2,
    ).execute(spark)
    days = {r[0] for r in out.select(F.dayofmonth("ts")).distinct().collect()}
    assert days == {2}


def test_slice_param(spark, field):
    out = OcgOperations(dataset=field, slice_={"time": 1}).execute(spark)
    assert out.select("ts").distinct().count() == 1
    assert out.first()["ts"].day == 2


def test_spatial_wrapping_and_vector_wrap(spark, field):
    # unwrap the data lons (negative -> +360), then wrap the output back
    out = OcgOperations(dataset=field,
                        spatial_wrapping="unwrap").execute(spark)
    assert out.agg(F.min("lon")).first()[0] > 180.0
    out2 = OcgOperations(dataset=field, spatial_wrapping="unwrap",
                         vector_wrap=True).execute(spark)
    lons1 = sorted(r[0] for r in
                   field.df.select("lon").distinct().collect())
    lons2 = sorted(r[0] for r in out2.select("lon").distinct().collect())
    assert lons2 == pytest.approx(lons1)


def test_output_crs_mercator(spark, field):
    out = OcgOperations(dataset=field,
                        output_crs="EPSG:3857").execute(spark)
    r = out.filter((F.col("cell_y") == 0) & (F.col("cell_x") == 0)).first()
    assert r["x"] == pytest.approx(6378137.0 * math.radians(r["lon"]),
                                   rel=1e-12)


def test_geom_cabinet_selection(spark, field, tmp_path):
    from ocgis_spark.geom_cabinet import write_geom_table

    uri = str(tmp_path / "selections")
    g = GOLDEN_GRID
    r1 = rect_ring(g.lon0, g.lat0, g.lon0 + 2 * g.res, g.lat0 + 2 * g.res)
    r2 = rect_ring(g.lon0 + 2 * g.res, g.lat0 + 2 * g.res,
                   g.lon0 + 4 * g.res, g.lat0 + 4 * g.res)
    write_geom_table(spark, uri, [(1, "poly", [r1]), (2, "poly", [r2])])
    # both ugids: SpatialCollection analogue — rows keyed by ugid
    out = OcgOperations(dataset=field, geom=uri,
                        abstraction="polygon").execute(spark)
    per = {r["ugid"]: r["n"] for r in
           out.groupBy("ugid").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(per) == {1, 2}
    assert per[1] == 4 * 3 and per[2] == 4 * 3  # 2x2 cells x 3 time steps
    # select one ugid only
    out1 = OcgOperations(dataset=field, geom=uri, geom_select_uid=[2],
                         abstraction="polygon").execute(spark)
    assert {r["ugid"] for r in out1.select("ugid").distinct().collect()} == {2}


def test_calc_raw_pools_unaggregated(spark, field):
    """calc_raw=True: the calc sees every raw row; False: the spatially
    pre-aggregated series. A per-group count (sample size via duration of
    threshold runs is overkill) — use icclim_SU counting raw exceedances."""
    sel = (GOLDEN_GRID.lon0, GOLDEN_GRID.lat0,
           GOLDEN_GRID.lon0 + 4 * GOLDEN_GRID.res,
           GOLDEN_GRID.lat0 + 4 * GOLDEN_GRID.res)
    base = dict(dataset=field, geom=sel, abstraction="polygon",
                aggregate=True, calc=[{"func": "icclim_SU",
                                       "threshold": 290.0}],
                calc_grouping=["month"])
    raw = OcgOperations(calc_raw=True, **base).execute(spark).first()["SU"]
    agg = OcgOperations(calc_raw=False, **base).execute(spark).first()["SU"]
    # raw: 6 of 16 cells exceed 290.15.. wait: values 273.15+10cy+cx, cy>=2
    # rows > 290 per step: cy=2: cx>=7 none (283..286); cy=3: 303..306 all 4
    # plus cy=2 values 293..296 all 4 -> 8 cells/step x 3 steps = 24
    assert raw == 24
    # aggregated series: mean over cells = 273.15+16.5 = 289.65 < 290 -> 0
    assert agg == 0
    with pytest.raises(DefinitionValidationError, match="calc_raw"):
        OcgOperations(dataset=field, calc_raw=True)


def test_regrid_destination_conserves_total(spark, field):
    from ocgis_spark.geo.cellindex import VectorGridSpec

    g = GOLDEN_GRID
    src = VectorGridSpec.from_edges(
        np.linspace(g.lon0, g.lon0 + 4 * g.res, 5),
        np.linspace(g.lat0, g.lat0 + 4 * g.res, 5),
    )
    dst = VectorGridSpec.from_edges(
        np.linspace(g.lon0, g.lon0 + 4 * g.res, 3),
        np.linspace(g.lat0, g.lat0 + 4 * g.res, 3),
    )
    one_t = field.df.filter(F.dayofmonth("ts") == 1)
    fld = Field(one_t, {"time": "ts", "x": "lon", "y": "lat",
                        "value": "value"}, src)
    out = OcgOperations(dataset=fld, grid=src,
                        regrid_destination=dst).execute(spark)
    # conservative: area-weighted mean preserved (uniform cells)
    got = out.agg(F.avg("value")).first()[0]
    want = one_t.agg(F.avg("value")).first()[0]
    assert got == pytest.approx(want, rel=1e-12)


def test_regrid_destination_bilinear_facade(spark, field):
    """regrid_options={'regrid_method': 'bilinear'} routes through the
    4-entry weight table; on a constant field the result is constant
    (weights sum to 1), and an invalid method raises."""
    from ocgis_spark.geo.cellindex import VectorGridSpec

    g = GOLDEN_GRID
    src = VectorGridSpec.from_edges(
        np.linspace(g.lon0, g.lon0 + 4 * g.res, 5),
        np.linspace(g.lat0, g.lat0 + 4 * g.res, 5),
    )
    dst = VectorGridSpec.from_edges(
        np.linspace(g.lon0, g.lon0 + 4 * g.res, 3),
        np.linspace(g.lat0, g.lat0 + 4 * g.res, 3),
    )
    one_t = field.df.filter(F.dayofmonth("ts") == 1).withColumn(
        "value", F.lit(7.25)
    )
    fld = Field(one_t, {"time": "ts", "x": "lon", "y": "lat",
                        "value": "value"}, src)
    out = OcgOperations(dataset=fld, grid=src, regrid_destination=dst,
                        regrid_options={"regrid_method": "bilinear"}
                        ).execute(spark)
    rows = out.collect()
    assert len(rows) == 4  # 2x2 destination
    for r in rows:
        assert r["value"] == pytest.approx(7.25, abs=1e-12)
    with pytest.raises(DefinitionValidationError, match="regrid_method"):
        OcgOperations(dataset=fld, grid=src, regrid_destination=dst,
                      regrid_options={"regrid_method": "patch"}
                      ).execute(spark)


def test_regrid_destination_idw_facade(spark, field):
    """regrid_options={'regrid_method': 'idw'} routes through the
    inverse-square weight table; on a constant field the result is
    constant (weights sum to 1)."""
    from ocgis_spark.geo.cellindex import VectorGridSpec

    g = GOLDEN_GRID
    src = VectorGridSpec.from_edges(
        np.linspace(g.lon0, g.lon0 + 4 * g.res, 5),
        np.linspace(g.lat0, g.lat0 + 4 * g.res, 5),
    )
    dst = VectorGridSpec.from_edges(
        np.linspace(g.lon0, g.lon0 + 4 * g.res, 3),
        np.linspace(g.lat0, g.lat0 + 4 * g.res, 3),
    )
    one_t = field.df.filter(F.dayofmonth("ts") == 1).withColumn(
        "value", F.lit(3.5)
    )
    fld = Field(one_t, {"time": "ts", "x": "lon", "y": "lat",
                        "value": "value"}, src)
    out = OcgOperations(dataset=fld, grid=src, regrid_destination=dst,
                        regrid_options={"regrid_method": "idw"}
                        ).execute(spark)
    rows = out.collect()
    assert len(rows) == 4
    for r in rows:
        assert r["value"] == pytest.approx(3.5, abs=1e-12)


def test_regrid_nearest_stod(spark, field):
    """nearest_stod: every destination takes exactly its nearest source
    center's value (brute-force distance argmin oracle)."""
    from ocgis_spark.geo.cellindex import VectorGridSpec
    from ocgis_spark.operators import regrid as regrid_ops

    g = GOLDEN_GRID
    src = VectorGridSpec.from_edges(
        np.array([g.lon0, g.lon0 + 0.7, g.lon0 + 1.5, g.lon0 + 2.9,
                  g.lon0 + 4.0]),
        np.array([g.lat0, g.lat0 + 1.2, g.lat0 + 2.1, g.lat0 + 4.0]),
    )
    dst = VectorGridSpec.from_edges(
        np.array([g.lon0, g.lon0 + 1.3, g.lon0 + 2.5, g.lon0 + 4.0]),
        np.array([g.lat0, g.lat0 + 1.9, g.lat0 + 4.0]),
    )
    vals = {int(j * src.nx + i): float(i * 10 + j)
            for j in range(src.ny) for i in range(src.nx)}
    sdf = spark.createDataFrame(
        [(k, v) for k, v in vals.items()], "src_id bigint, value double"
    )
    w = regrid_ops.nearest_weights_vector(spark, src, dst)
    got = {r["dst_id"]: r["dst_value"]
           for r in regrid_ops.apply_weights(sdf, w).collect()}
    sxc = (src.xb()[:-1] + src.xb()[1:]) / 2.0
    syc = (src.yb()[:-1] + src.yb()[1:]) / 2.0
    dxc = (dst.xb()[:-1] + dst.xb()[1:]) / 2.0
    dyc = (dst.yb()[:-1] + dst.yb()[1:]) / 2.0
    for j in range(dst.ny):
        for i in range(dst.nx):
            bi = int(np.argmin(np.abs(sxc - dxc[i])))
            bj = int(np.argmin(np.abs(syc - dyc[j])))
            assert got[j * dst.nx + i] == vals[bj * src.nx + bi], (i, j)
    assert len(got) == dst.nx * dst.ny
