"""transform_crs (reference update_crs, src/ocgis/variable/crs.py:458+):
native closed-form pairs run as Catalyst columns and are exercised
in-container; arbitrary PROJ CRSs go through the pyproj Arrow UDF
(skip-tested — pyproj is not shipped here, FIDELITY.md)."""

import math

import pytest
from pyspark.sql import functions as F

from ocgis_spark.operators import crs


@pytest.fixture()
def coords(spark):
    return spark.createDataFrame(
        [(0, 0.0, 0.0), (1, 180.0, 45.0), (2, -73.98, 40.71),
         (3, 12.5, -33.9)],
        "pid int, lon double, lat double",
    )


def test_mercator_forward_known_values(spark, coords):
    out = {r["pid"]: (r["x"], r["y"])
           for r in crs.transform_crs(coords, "EPSG:4326", "EPSG:3857").collect()}
    R = 6378137.0
    assert out[1][0] == pytest.approx(20037508.342789244, rel=1e-12)
    assert out[1][1] == pytest.approx(
        R * math.log(math.tan(math.pi / 4 + math.radians(45.0) / 2)), rel=1e-12
    )
    assert out[0][0] == 0.0
    assert out[0][1] == pytest.approx(0.0, abs=1e-6)


def test_mercator_round_trip(spark, coords):
    fwd = crs.transform_crs(coords, "4326", "3857")
    back = crs.transform_crs(
        fwd, "3857", "4326", lon="x", lat="y", out_x="lon2", out_y="lat2"
    )
    for r in back.collect():
        assert r["lon2"] == pytest.approx(r["lon"], abs=1e-9)
        assert r["lat2"] == pytest.approx(r["lat"], abs=1e-9)


def test_equidistant_cylindrical(spark, coords):
    out = crs.transform_crs(coords, "EPSG:4326", "EPSG:4087").collect()
    R = 6378137.0
    for r in out:
        assert r["x"] == pytest.approx(R * math.radians(r["lon"]), rel=1e-12)
        assert r["y"] == pytest.approx(R * math.radians(r["lat"]), rel=1e-12)


def test_identity_crs(spark, coords):
    out = crs.transform_crs(coords, "EPSG:4326", "epsg:4326").collect()
    for r in out:
        assert (r["x"], r["y"]) == (r["lon"], r["lat"])


def test_native_path_stays_jvm_side(spark, coords):
    plan = crs.transform_crs(coords, "EPSG:4326", "EPSG:3857")._jdf \
        .queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan  # no Python in the native path


def test_unknown_crs_without_pyproj_raises(spark, coords):
    try:
        import pyproj  # noqa: F401
        pytest.skip("pyproj available — generic path tested below")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="needs pyproj"):
        crs.transform_crs(coords, "EPSG:4326", "EPSG:32633").collect()


def test_pyproj_generic_path(spark, coords):
    """Exercises the Arrow-UDF wiring when pyproj is installed (cluster
    environments); validates UTM 33N against pyproj itself."""
    pyproj = pytest.importorskip("pyproj")
    out = crs.transform_crs(coords, "EPSG:4326", "EPSG:32633").collect()
    tr = pyproj.Transformer.from_crs("EPSG:4326", "EPSG:32633", always_xy=True)
    for r in out:
        ex, ey = tr.transform(r["lon"], r["lat"])
        assert r["x"] == pytest.approx(ex, rel=1e-12)
        assert r["y"] == pytest.approx(ey, rel=1e-12)


# ---------------------------------------------------------------------------
# CF conic / polar family (r4): Snyder-sphere closed forms as native
# Catalyst columns (reference CFLambertConformal crs.py:1082,
# CFAlbersEqualArea crs.py:1071, CFPolarStereographic crs.py:1100)
# ---------------------------------------------------------------------------

LCC_NARCCAP = {"proj": "lcc", "lat_1": 30.0, "lat_2": 60.0, "lat_0": 47.5,
               "lon_0": -97.0, "x_0": 3325000.0, "y_0": 2700000.0}
AEA_CONUS = {"proj": "aea", "lat_1": 29.5, "lat_2": 45.5, "lat_0": 23.0,
             "lon_0": -96.0}
STERE_N = {"proj": "stere", "lat_0": 90.0, "lon_0": -45.0, "lat_ts": 70.0}
STERE_S = {"proj": "stere", "lat_0": -90.0, "lon_0": 0.0, "k_0": 0.97276}


def test_lcc_constants_match_snyder_example():
    # Snyder (1987) p. 295 sphere example: R=1, lat_1=33, lat_2=45,
    # lat_0=23, lon_0=-96; published n=0.6304777, F=1.9550002,
    # rho_0=1.5071429
    p = {"proj": "lcc", "lat_1": 33.0, "lat_2": 45.0, "lat_0": 23.0,
         "lon_0": -96.0, "R": 1.0}
    n, RF, rho0, _ = crs._lcc_constants(p)
    assert n == pytest.approx(0.6304777, abs=1e-7)
    assert RF == pytest.approx(1.9550002, abs=1e-7)
    assert rho0 == pytest.approx(1.5071429, abs=1e-7)


def test_lcc_forward_matches_snyder_example(spark):
    # point (35 N, 75 W) -> x=0.2966785, y=0.2462112 (Snyder p. 295)
    p = {"proj": "lcc", "lat_1": 33.0, "lat_2": 45.0, "lat_0": 23.0,
         "lon_0": -96.0, "R": 1.0}
    df = spark.createDataFrame([(-75.0, 35.0)], "lon double, lat double")
    r = crs.transform_crs(df, "EPSG:4326", p).collect()[0]
    assert r["x"] == pytest.approx(0.2966785, abs=1e-7)
    assert r["y"] == pytest.approx(0.2462112, abs=1e-7)


def test_aea_forward_matches_snyder_example(spark):
    # Snyder p. 291 sphere example -> x=0.2952720, y=0.2416774
    p = dict(AEA_CONUS, R=1.0)
    df = spark.createDataFrame([(-75.0, 35.0)], "lon double, lat double")
    r = crs.transform_crs(df, "EPSG:4326", p).collect()[0]
    assert r["x"] == pytest.approx(0.2952720, abs=1e-7)
    assert r["y"] == pytest.approx(0.2416774, abs=1e-7)


@pytest.mark.parametrize("p", [LCC_NARCCAP, AEA_CONUS, STERE_N, STERE_S])
def test_param_crs_round_trip(spark, p):
    pts = [(-105.3, 38.2), (-101.5, 36.5), (-97.0, 47.5), (-75.0, 35.0),
           (-39.0, 62.0), (10.0, -70.0) if p is STERE_S else (20.0, 55.0)]
    df = spark.createDataFrame(pts, "lon double, lat double")
    fwd = crs.transform_crs(df, "EPSG:4326", p)
    back = crs.transform_crs(
        fwd, p, "EPSG:4326", lon="x", lat="y", out_x="lon2", out_y="lat2"
    )
    for r in back.collect():
        assert r["lon2"] == pytest.approx(r["lon"], abs=1e-9)
        assert r["lat2"] == pytest.approx(r["lat"], abs=1e-9)


def test_aea_preserves_area(spark):
    # equal-area property: a 0.1° cell projected to AEA planar coords has
    # area == R² · spherical cell area (the defining invariant)
    import numpy as np

    p = AEA_CONUS
    R = crs.R_SPHERE
    lon0, lat0, d = -102.35, 39.15, 0.1
    corners = [(lon0, lat0), (lon0 + d, lat0), (lon0 + d, lat0 + d),
               (lon0, lat0 + d)]
    df = spark.createDataFrame(corners, "lon double, lat double")
    xy = [(r["x"], r["y"])
          for r in crs.transform_crs(df, "EPSG:4326", p).collect()]
    # planar polygon area (shoelace)
    a = 0.0
    for i in range(4):
        x1, y1 = xy[i]
        x2, y2 = xy[(i + 1) % 4]
        a += x1 * y2 - x2 * y1
    planar = abs(a) / 2.0
    spherical = (
        R * R * math.radians(d)
        * (math.sin(math.radians(lat0 + d)) - math.sin(math.radians(lat0)))
    )
    assert planar == pytest.approx(spherical, rel=1e-6)


def test_lcc_conformal_scale_true_at_standard_parallels(spark):
    # k = n·rho / (R·cos(phi)) must be 1 exactly at lat_1 and lat_2
    p = LCC_NARCCAP
    n, RF, _, R = crs._lcc_constants(p)
    for lat in (p["lat_1"], p["lat_2"]):
        rho = RF / math.tan(math.pi / 4 + math.radians(lat) / 2) ** n
        k = n * rho / (R * math.cos(math.radians(lat)))
        assert k == pytest.approx(1.0, rel=1e-12)


def test_stere_true_scale_at_lat_ts():
    # k = 2k0 / (1 + sin(phi)) == 1 at the standard parallel
    sgn, RK2, R = crs._stere_constants(STERE_N)
    k0 = RK2 / (2 * R)
    assert 2 * k0 / (1 + math.sin(math.radians(70.0))) == pytest.approx(
        1.0, rel=1e-12
    )


def test_param_sql_is_dialect_neutral():
    # the SAME SQL strings that back the Catalyst columns run in DuckDB
    # and agree to the last ulp-ish with Spark (oracle-twin guarantee)
    import duckdb

    from ocgis_spark.session import get_spark

    spark = get_spark(cpus=2)
    pts = [(-105.3, 38.2), (-97.0, 47.5), (-39.0, 82.0), (-101.5, 36.5)]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE pts AS SELECT * FROM (VALUES "
        + ", ".join(f"(CAST({x} AS DOUBLE), CAST({y} AS DOUBLE))"
                    for x, y in pts)
        + ") t(lon, lat)"
    )
    sdf = spark.createDataFrame(pts, "lon double, lat double")
    for p in (LCC_NARCCAP, AEA_CONUS, STERE_N):
        emit = crs._PARAM_PROJS[p["proj"]][0]
        ex, ey = emit(p)
        duck = con.execute(
            f"SELECT {ex} AS x, {ey} AS y FROM pts ORDER BY lon"
        ).fetchall()
        got = sorted(
            (r["x"], r["y"])
            for r in sdf.selectExpr(f"{ex} AS x", f"{ey} AS y", "lon")
            .collect()
        )
        for (dx, dy), (sx, sy) in zip(sorted(duck), got):
            assert sx == pytest.approx(dx, abs=1e-6)
            assert sy == pytest.approx(dy, abs=1e-6)


def test_param_crs_plan_is_pure_codegen(spark):
    df = spark.createDataFrame([(-97.0, 45.0)], "lon double, lat double")
    plan = crs.transform_crs(df, "EPSG:4326", LCC_NARCCAP)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_stere_rejects_non_polar():
    with pytest.raises(ValueError, match="polar"):
        crs._stere_constants({"proj": "stere", "lat_0": 45.0})


def test_crs_from_cf_attrs_mappings():
    from ocgis_spark.ncmodel import crs_from_cf_attrs

    lcc = crs_from_cf_attrs({
        "grid_mapping_name": "lambert_conformal_conic",
        "standard_parallel": [30.0, 60.0],
        "longitude_of_central_meridian": -97.0,
        "latitude_of_projection_origin": 47.5,
        "false_easting": 3325000.0, "false_northing": 2700000.0,
    })
    assert lcc == {"proj": "lcc", "lat_1": 30.0, "lat_2": 60.0,
                   "lat_0": 47.5, "lon_0": -97.0,
                   "x_0": 3325000.0, "y_0": 2700000.0}
    # scalar standard_parallel -> lat_1 == lat_2 (tangent cone)
    aea = crs_from_cf_attrs({
        "grid_mapping_name": "albers_conical_equal_area",
        "standard_parallel": 50.0,
    })
    assert aea["lat_1"] == aea["lat_2"] == 50.0
    st = crs_from_cf_attrs({
        "grid_mapping_name": "polar_stereographic",
        "standard_parallel": 71.0,
        "straight_vertical_longitude_from_pole": -39.0,
        "latitude_of_projection_origin": 90.0,
    })
    assert st["proj"] == "stere" and st["lat_ts"] == 71.0
    rp = crs_from_cf_attrs({
        "grid_mapping_name": "rotated_latitude_longitude",
        "grid_north_pole_longitude": -162.0,
        "grid_north_pole_latitude": 39.25,
    })
    assert rp["proj"] == "rotated_pole"
    assert crs_from_cf_attrs({"grid_mapping_name": "latitude_longitude"}) \
        == "EPSG:4326"
    with pytest.raises(NotImplementedError, match="geostationary"):
        crs_from_cf_attrs({"grid_mapping_name": "geostationary"})


def test_cf_attrs_end_to_end_transform(spark):
    # CF attrs -> spec -> native transform -> round trip (the NARCCAP
    # day-one path: subset a Lambert-conformal file)
    from ocgis_spark.ncmodel import crs_from_cf_attrs

    spec = crs_from_cf_attrs({
        "grid_mapping_name": "lambert_conformal_conic",
        "standard_parallel": [30.0, 60.0],
        "longitude_of_central_meridian": -97.0,
        "latitude_of_projection_origin": 47.5,
    })
    df = spark.createDataFrame(
        [(-105.3, 38.2), (-89.0, 44.0)], "lon double, lat double"
    )
    back = crs.transform_crs(
        crs.transform_crs(df, "EPSG:4326", spec), spec, "EPSG:4326",
        lon="x", lat="y", out_x="lon2", out_y="lat2",
    )
    for r in back.collect():
        assert r["lon2"] == pytest.approx(r["lon"], abs=1e-9)
        assert r["lat2"] == pytest.approx(r["lat"], abs=1e-9)


OMERC_NARCCAP = {"proj": "omerc", "lat_0": 47.5, "lonc": -97.0,
                 "alpha": 55.0, "k_0": 1.0}


def test_omerc_round_trip(spark):
    pts = [(-105.3, 38.2), (-97.0, 47.5), (-89.0, 44.0), (-60.0, 20.0),
           (-120.0, 55.0)]
    df = spark.createDataFrame(pts, "lon double, lat double")
    fwd = crs.transform_crs(df, "EPSG:4326", OMERC_NARCCAP)
    back = crs.transform_crs(
        fwd, OMERC_NARCCAP, "EPSG:4326", lon="x", lat="y",
        out_x="lon2", out_y="lat2",
    )
    for r in back.collect():
        assert r["lon2"] == pytest.approx(r["lon"], abs=1e-9)
        assert r["lat2"] == pytest.approx(r["lat"], abs=1e-9)


def test_omerc_central_line_properties(spark):
    # the central point lies on the oblique equator (v = 0), and a small
    # great-circle step along azimuth alpha stays on it to second order
    df = spark.createDataFrame(
        [(-97.0, 47.5)], "lon double, lat double"
    )
    r = crs.transform_crs(df, "EPSG:4326", OMERC_NARCCAP).collect()[0]
    assert r["y"] == pytest.approx(0.0, abs=1e-6)
    d = 0.01
    lat2 = 47.5 + d * math.cos(math.radians(55.0))
    lon2 = -97.0 + d * math.sin(math.radians(55.0)) / math.cos(
        math.radians(47.5)
    )
    df2 = spark.createDataFrame([(lon2, lat2)], "lon double, lat double")
    r2 = crs.transform_crs(df2, "EPSG:4326", OMERC_NARCCAP).collect()[0]
    step = d * math.pi / 180.0 * crs.R_SPHERE
    # v residual second-order in the step; u (measured from the oblique
    # origin at lambda0, not the central point) ADVANCES by the step
    assert abs(r2["y"]) < 0.001 * step
    assert r2["x"] - r["x"] == pytest.approx(step, rel=0.01)


def test_omerc_alpha360_is_transverse_aspect(spark):
    # alpha=360 (the reference default, CFNarccapObliqueMercator
    # crs.py:1127-1130) puts the oblique pole on the equator: the
    # projection is the transverse aspect — x along the meridian
    # (R·k0·(phi) at dl=0), y = -R·k0·atanh(cos(phi)·sin(dl))
    p = {"proj": "omerc", "lat_0": 0.0, "lonc": -97.0, "alpha": 360.0,
         "k_0": 1.0, "R": 1.0}
    df = spark.createDataFrame(
        [(-97.0, 30.0), (-96.0, 0.0)], "lon double, lat double"
    )
    out = {(r["lon"], r["lat"]): (r["x"], r["y"])
           for r in crs.transform_crs(df, "EPSG:4326", p)
           .select("lon", "lat", "x", "y").collect()}
    x, y = out[(-97.0, 30.0)]
    assert x == pytest.approx(math.radians(30.0), abs=1e-12)
    assert y == pytest.approx(0.0, abs=1e-12)
    x, y = out[(-96.0, 0.0)]
    B = math.cos(0.0) * math.sin(math.radians(1.0))
    assert y == pytest.approx(-math.atanh(B), abs=1e-12)


def test_cf_transverse_mercator_attrs_map_to_omerc():
    from ocgis_spark.ncmodel import crs_from_cf_attrs

    spec = crs_from_cf_attrs({
        "grid_mapping_name": "transverse_mercator",
        "latitude_of_projection_origin": 47.5,
        "longitude_of_central_meridian": -97.0,
        "scale_factor_at_central_meridian": 1.0,
        "alpha": 55.0,
    })
    assert spec["proj"] == "omerc" and spec["alpha"] == 55.0
    # alpha defaults to 360 like the reference class
    spec2 = crs_from_cf_attrs({
        "grid_mapping_name": "transverse_mercator",
        "longitude_of_central_meridian": -97.0,
    })
    assert spec2["alpha"] == 360.0


def test_param_crs_round_trip_property(spark):
    """Hypothesis-style fuzz (deterministic grid, no RNG): every point in
    a lon/lat lattice inside each projection's valid domain round-trips
    through the native forward+inverse to 1e-8 degrees."""
    pts = [
        (lon, lat)
        for lon in range(-170, 171, 20)
        for lat in range(-80, 81, 10)
    ]
    domains = {
        "lcc": lambda lon, lat: 5.0 <= lat <= 85.0,        # north cone
        "aea": lambda lon, lat: -20.0 <= lat <= 85.0,
        "stere": lambda lon, lat: lat >= 5.0,              # north polar
        "omerc": lambda lon, lat: abs(lat) <= 80.0,
    }
    specs = {
        "lcc": LCC_NARCCAP, "aea": AEA_CONUS, "stere": STERE_N,
        "omerc": OMERC_NARCCAP,
    }
    for proj, spec in specs.items():
        ok = [(float(lo), float(la)) for lo, la in pts
              if domains[proj](lo, la)]
        df = spark.createDataFrame(ok, "lon double, lat double")
        back = crs.transform_crs(
            crs.transform_crs(df, "EPSG:4326", spec), spec, "EPSG:4326",
            lon="x", lat="y", out_x="lon2", out_y="lat2",
        )
        bad = back.filter(
            (F.abs(F.col("lon2") - F.col("lon")) > 1e-8)
            | (F.abs(F.col("lat2") - F.col("lat")) > 1e-8)
        ).count()
        assert bad == 0, proj


# ---- ellipsoidal datum family (Snyder ellipsoidal forms) ------------

LCC_CLRK = {"proj": "lcc", "lat_1": 33.0, "lat_2": 45.0, "lat_0": 23.0,
            "lon_0": -96.0, "ellps": "clrk66"}
AEA_CLRK = {"proj": "aea", "lat_1": 29.5, "lat_2": 45.5, "lat_0": 23.0,
            "lon_0": -96.0, "ellps": "clrk66"}
STERE_INTL_S = {"proj": "stere", "lat_0": -90.0, "lat_ts": -71.0,
                "lon_0": -100.0, "ellps": "intl"}
LCC_WGS84 = {"proj": "lcc", "lat_1": 30.0, "lat_2": 60.0, "lat_0": 47.5,
             "lon_0": -97.0, "ellps": "WGS84"}
STERE_NSIDC = {"proj": "stere", "lat_0": 90.0, "lat_ts": 70.0,
               "lon_0": -45.0, "a": 6378137.0, "rf": 298.257223563}
UPS_N = {"proj": "stere", "lat_0": 90.0, "k_0": 0.994, "lon_0": 0.0,
         "ellps": "WGS84"}  # Universal Polar Stereographic (k0 form)


def test_lcc_ellipsoidal_matches_snyder_example(spark):
    # Snyder (1987) p. 296-297, Clarke 1866: (35 N, 75 W) ->
    # x = 1,894,410.9 m, y = 1,564,649.5 m
    df = spark.createDataFrame([(-75.0, 35.0)], "lon double, lat double")
    r = crs.transform_crs(df, "EPSG:4326", LCC_CLRK).collect()[0]
    assert r["x"] == pytest.approx(1894410.9, abs=0.5)
    assert r["y"] == pytest.approx(1564649.5, abs=0.5)


def test_aea_ellipsoidal_matches_snyder_example(spark):
    # Snyder p. 292, Clarke 1866: (35 N, 75 W) ->
    # x = 1,885,472.7 m, y = 1,535,925.0 m
    df = spark.createDataFrame([(-75.0, 35.0)], "lon double, lat double")
    r = crs.transform_crs(df, "EPSG:4326", AEA_CLRK).collect()[0]
    assert r["x"] == pytest.approx(1885472.7, abs=0.5)
    assert r["y"] == pytest.approx(1535925.0, abs=0.5)


def test_stere_ellipsoidal_matches_snyder_example(spark):
    # Snyder p. 315, International 1924, south polar with lat_ts=-71:
    # (75 S, 150 E) -> x = -1,540,033.6 m, y = -560,526.4 m
    df = spark.createDataFrame([(150.0, -75.0)], "lon double, lat double")
    r = crs.transform_crs(df, "EPSG:4326", STERE_INTL_S).collect()[0]
    assert r["x"] == pytest.approx(-1540033.6, abs=0.5)
    assert r["y"] == pytest.approx(-560526.4, abs=0.5)


@pytest.mark.parametrize("p", [LCC_CLRK, AEA_CLRK, STERE_INTL_S,
                               LCC_WGS84, STERE_NSIDC, UPS_N])
def test_ellipsoidal_round_trip(spark, p):
    south = p.get("lat_0", 0) == -90.0
    pts = [(-105.3, -38.2 if south else 38.2),
           (-75.0, -35.0 if south else 35.0),
           (150.0, -75.0 if south else 75.0),
           (-39.0, -62.0 if south else 62.0)]
    df = spark.createDataFrame(pts, "lon double, lat double")
    fwd = crs.transform_crs(df, "EPSG:4326", p)
    back = crs.transform_crs(
        fwd, p, "EPSG:4326", lon="x", lat="y", out_x="lon2", out_y="lat2"
    )
    # inverse latitude goes through the conformal/authalic SERIES —
    # truncation ~1e-12 rad (conformal) / ~3e-10 rad (authalic), so
    # 1e-6 deg covers every case with margin
    for r in back.collect():
        assert r["lon2"] == pytest.approx(r["lon"], abs=1e-6)
        assert r["lat2"] == pytest.approx(r["lat"], abs=1e-6)


def test_ellipsoidal_reduces_to_sphere():
    # rf -> inf degenerates to the sphere of radius a: ellipsoidal SQL
    # must converge to the spherical SQL's values
    import duckdb

    p_ell = dict(LCC_WGS84, ellps=None, a=6378137.0, rf=1e9)
    p_sph = {k: v for k, v in LCC_WGS84.items() if k != "ellps"}
    p_sph["R"] = 6378137.0
    ex, ey = crs._lcc_ell_sql(p_ell, "lon", "lat")
    sx, sy = crs.lcc_sql(p_sph)
    r = duckdb.sql(
        f"SELECT {ex} AS ex, {ey} AS ey, {sx} AS sx, {sy} AS sy FROM "
        f"(SELECT CAST(-75.0 AS DOUBLE) AS lon, CAST(35.0 AS DOUBLE) AS lat)"
    ).fetchone()
    assert r[0] == pytest.approx(r[2], rel=1e-8)
    assert r[1] == pytest.approx(r[3], rel=1e-8)


def _duck_xy(p, lon, lat):
    import duckdb

    fwd = {"lcc": crs._lcc_ell_sql, "aea": crs._aea_ell_sql,
           "stere": crs._stere_ell_sql}[p["proj"]]
    x, y = fwd(p, "lon", "lat")
    return duckdb.sql(
        f"SELECT {x} AS x, {y} AS y FROM (SELECT CAST({lon!r} AS DOUBLE) "
        f"AS lon, CAST({lat!r} AS DOUBLE) AS lat)"
    ).fetchone()


def test_lcc_ellipsoidal_conformal_isotropy():
    # conformality: scale along the meridian == scale along the parallel
    # (finite differences against the ellipsoid's M and N radii)
    a, e2 = crs.ellipsoid_of(LCC_WGS84)
    for lon, lat in ((-97.0, 45.0), (-80.0, 33.5)):
        d = 1e-5
        x0, y0 = _duck_xy(LCC_WGS84, lon, lat)
        xl, yl = _duck_xy(LCC_WGS84, lon + d, lat)
        xp, yp = _duck_xy(LCC_WGS84, lon, lat + d)
        w2 = 1.0 - e2 * math.sin(math.radians(lat)) ** 2
        N = a / math.sqrt(w2)                 # prime-vertical radius
        M = a * (1.0 - e2) / w2 ** 1.5        # meridian radius
        k = math.hypot(xl - x0, yl - y0) / (
            N * math.cos(math.radians(lat)) * math.radians(d))
        h = math.hypot(xp - x0, yp - y0) / (M * math.radians(d))
        assert k == pytest.approx(h, rel=1e-5)


def test_aea_ellipsoidal_equal_area_jacobian():
    # equal-area: |J| = M * N cos(phi) (the ellipsoid area element)
    a, e2 = crs.ellipsoid_of(AEA_CLRK)
    for lon, lat in ((-96.0, 35.0), (-110.0, 44.5)):
        d = 1e-5
        x0, y0 = _duck_xy(AEA_CLRK, lon, lat)
        xl, yl = _duck_xy(AEA_CLRK, lon + d, lat)
        xp, yp = _duck_xy(AEA_CLRK, lon, lat + d)
        dd = math.radians(d)
        J = abs((xl - x0) * (yp - y0) - (xp - x0) * (yl - y0)) / (dd * dd)
        w2 = 1.0 - e2 * math.sin(math.radians(lat)) ** 2
        N = a / math.sqrt(w2)
        M = a * (1.0 - e2) / w2 ** 1.5
        assert J == pytest.approx(M * N * math.cos(math.radians(lat)),
                                  rel=1e-4)


def test_stere_ellipsoidal_true_scale_at_lat_ts():
    # k == 1 exactly at the standard parallel (finite diff along it)
    a, e2 = crs.ellipsoid_of(STERE_NSIDC)
    lat = STERE_NSIDC["lat_ts"]
    d = 1e-5
    x0, y0 = _duck_xy(STERE_NSIDC, 30.0, lat)
    xl, yl = _duck_xy(STERE_NSIDC, 30.0 + d, lat)
    w2 = 1.0 - e2 * math.sin(math.radians(lat)) ** 2
    N = a / math.sqrt(w2)
    k = math.hypot(xl - x0, yl - y0) / (
        N * math.cos(math.radians(lat)) * math.radians(d))
    assert k == pytest.approx(1.0, rel=1e-6)


def test_ellipsoidal_sql_dialect_neutral(spark):
    # the SAME strings back Catalyst and DuckDB (oracle-twin guarantee)
    import duckdb

    pts = [(-105.3, 38.2), (-97.0, 47.5), (-39.0, 82.0)]
    df = spark.createDataFrame(pts, "lon double, lat double")
    for p in (LCC_WGS84, STERE_NSIDC, AEA_CLRK, UPS_N):
        fwd = {"lcc": crs._lcc_ell_sql, "aea": crs._aea_ell_sql,
               "stere": crs._stere_ell_sql}[p["proj"]]
        x, y = fwd(p, "lon", "lat")
        got = sorted(
            (r["x"], r["y"])
            for r in df.selectExpr(f"{x} AS x", f"{y} AS y").collect()
        )
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE pts AS SELECT * FROM (VALUES "
            + ", ".join(f"(CAST({lo!r} AS DOUBLE), CAST({la!r} AS DOUBLE))"
                        for lo, la in pts)
            + ") t(lon, lat)"
        )
        want = sorted(con.sql(f"SELECT {x} AS x, {y} AS y FROM pts").fetchall())
        for (gx, gy), (wx, wy) in zip(got, want):
            assert gx == pytest.approx(wx, rel=1e-12)
            assert gy == pytest.approx(wy, rel=1e-12)


def test_cf_attrs_datum_routing(spark):
    from ocgis_spark.ncmodel import crs_from_cf_attrs

    # semi_major_axis + inverse_flattening -> ellipsoidal native path
    spec = crs_from_cf_attrs({
        "grid_mapping_name": "lambert_conformal_conic",
        "standard_parallel": [33.0, 45.0],
        "latitude_of_projection_origin": 23.0,
        "longitude_of_central_meridian": -96.0,
        "semi_major_axis": 6378206.4, "semi_minor_axis": 6356583.8,
    })
    assert crs.ellipsoid_of(spec) == pytest.approx(
        (6378206.4, 1.0 - (6356583.8 / 6378206.4) ** 2))
    df = spark.createDataFrame([(-75.0, 35.0)], "lon double, lat double")
    r = crs.transform_crs(df, "EPSG:4326", spec).collect()[0]
    assert r["x"] == pytest.approx(1894410.9, abs=0.5)  # Snyder p.296
    # earth_radius forces the sphere
    spec_r = crs_from_cf_attrs({
        "grid_mapping_name": "polar_stereographic",
        "latitude_of_projection_origin": 90.0,
        "standard_parallel": 70.0, "earth_radius": 6371000.0,
    })
    assert crs.ellipsoid_of(spec_r) is None and spec_r["R"] == 6371000.0


def test_omerc_rejects_ellipsoid():
    # the DIRECT spherical emitter still refuses a datum; the
    # _PARAM_PROJS dispatch routes such dicts to _omerc_ell_sql instead
    with pytest.raises(NotImplementedError, match="spherical only"):
        crs.omerc_sql({"proj": "omerc", "lat_0": 47.5, "lonc": -97.0,
                       "alpha": 360.0, "ellps": "WGS84"})


OMERC_ELL = {"proj": "omerc", "lat_0": 4.0, "lonc": 115.0,
             "alpha": 53.31582, "k_0": 0.99984, "a": 6377298.556,
             "rf": 300.8017}  # Borneo RSO shape (Snyder table 12)
_OMERC_PTS = [(115.8, 5.38), (114.0, 2.0), (118.5, 7.2), (110.0, -3.0),
              (120.0, 10.0), (115.0, 4.0)]


def test_omerc_ellipsoidal_spherical_continuation(spark):
    """The ellipsoidal Hotine must converge to the (golden-verified)
    spherical omerc as e -> 0, with residual shrinking O(e^2): quartering
    the flattening four-times quarters the max residual. This pins both
    the formulas and the axis-sign convention (FIDELITY.md)."""
    df = spark.createDataFrame(_OMERC_PTS, "lon double, lat double")
    sph = dict(OMERC_ELL, R=OMERC_ELL["a"])
    sph.pop("a"), sph.pop("rf")
    ref = {r["lon"]: (r["x"], r["y"])
           for r in crs.transform_crs(df, "EPSG:4326", sph).collect()}
    prev = None
    for mult in (1.0, 4.0, 16.0):
        ell = dict(OMERC_ELL, rf=OMERC_ELL["rf"] * mult)
        d = 0.0
        for r in crs.transform_crs(df, "EPSG:4326", ell).collect():
            x0, y0 = ref[r["lon"]]
            d = max(d, abs(r["x"] - x0), abs(r["y"] - y0))
        if prev is not None:
            assert prev / d == pytest.approx(4.0, rel=0.02)
        prev = d


def test_omerc_ellipsoidal_round_trip(spark):
    df = spark.createDataFrame(_OMERC_PTS, "lon double, lat double")
    fwd = crs.transform_crs(df, "EPSG:4326", OMERC_ELL)
    back = crs.transform_crs(
        fwd, OMERC_ELL, "EPSG:4326", lon="x", lat="y",
        out_x="lon2", out_y="lat2",
    )
    for r in back.collect():
        assert r["lon2"] == pytest.approx(r["lon"], abs=1e-9)
        assert r["lat2"] == pytest.approx(r["lat"], abs=1e-9)


def test_omerc_ellipsoidal_mercator_reduction(spark):
    """alpha=90 at lat_0=0 degenerates the Hotine central line onto the
    equator: u,v must equal the standard ellipsoidal Mercator x,y
    (independent closed-form truth, Snyder 7-6/7-7) to sub-mm."""
    p = {"proj": "omerc", "lat_0": 0.0, "lonc": 0.0, "alpha": 90.0,
         "k_0": 1.0, "a": 6378137.0, "rf": 298.257223563}
    a, e2 = crs.ellipsoid_of(p)
    e = math.sqrt(e2)
    df = spark.createDataFrame(_OMERC_PTS, "lon double, lat double")
    for r in crs.transform_crs(df, "EPSG:4326", p).collect():
        lam, phi = math.radians(r["lon"]), math.radians(r["lat"])
        mx = a * lam
        my = a * math.log(
            math.tan(math.pi / 4.0 + phi / 2.0)
            * ((1.0 - e * math.sin(phi)) / (1.0 + e * math.sin(phi)))
            ** (e / 2.0)
        )
        assert r["x"] == pytest.approx(mx, abs=1e-6)
        assert r["y"] == pytest.approx(my, abs=1e-6)


def test_unknown_ellps_name_raises():
    with pytest.raises(NotImplementedError, match="unknown ellps"):
        crs.ellipsoid_of({"proj": "lcc", "lat_1": 30.0, "ellps": "bessel99"})


def test_param_to_native_epsg_composition(spark):
    """Parametric dict <-> native EPSG closed-form pairs compose through
    geographic (lcc -> web mercator and back), staying pure codegen."""
    pts = [(-105.3, 38.2), (-97.0, 47.5), (-80.0, 33.5)]
    df = spark.createDataFrame(pts, "lon double, lat double")
    lcc = dict(LCC_NARCCAP)
    planar = crs.transform_crs(df, "EPSG:4326", lcc)
    merc = crs.transform_crs(
        planar, lcc, "EPSG:3857", lon="x", lat="y",
        out_x="mx", out_y="my",
    )
    plan = merc._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    direct = crs.transform_crs(df, "EPSG:4326", "EPSG:3857")
    for chained, want in zip(
        merc.select("mx", "my").collect(),
        direct.select("x", "y").collect(),
    ):
        assert chained["mx"] == pytest.approx(want["x"], abs=1e-6)
        assert chained["my"] == pytest.approx(want["y"], abs=1e-6)
    # and native EPSG -> parametric dict (the reverse leg)
    back = crs.transform_crs(
        direct, "EPSG:3857", lcc, lon="x", lat="y",
        out_x="px", out_y="py",
    )
    for r, want in zip(
        back.select("px", "py").collect(),
        planar.select("x", "y").collect(),
    ):
        assert r["px"] == pytest.approx(want["x"], abs=1e-6)
        assert r["py"] == pytest.approx(want["y"], abs=1e-6)


def test_stere_ellipsoidal_k0_is_pole_scale():
    """k0-form normalization (Snyder 21-33): the scale factor
    k = rho / (a m(phi)) tends to k0 at the pole."""
    a, e2 = crs.ellipsoid_of(UPS_N)
    e = math.sqrt(e2)
    sgn, coef = crs._stere_ell_coef(UPS_N, a, e2)
    phi = math.radians(89.9999)
    k = coef * crs._t_of(phi, e) / (a * crs._m_of(phi, e2))
    assert k == pytest.approx(0.994, rel=1e-7)


def test_ellipsoid_of_a_with_ellps_keeps_flattening():
    """PROJ semantics: an explicit 'a' next to 'ellps' resizes the named
    ellipsoid — it must NOT silently degrade to a sphere of radius a."""
    ell = crs.ellipsoid_of({"proj": "lcc", "lat_1": 30.0,
                            "a": 6378137.0, "ellps": "GRS80"})
    assert ell is not None
    a, e2 = ell
    assert a == 6378137.0 and e2 == pytest.approx(0.00669438, abs=1e-7)
    # bare a, no name: sphere of radius a
    assert crs.ellipsoid_of({"proj": "lcc", "a": 6378137.0}) is None
    # explicit rf beside the name wins over the name's rf
    a2, e22 = crs.ellipsoid_of({"proj": "lcc", "ellps": "WGS84", "rf": 300.0})
    f = 1.0 / 300.0
    assert e22 == pytest.approx(f * (2 - f), rel=1e-12)


def test_tripole_tag_is_geographic_passthrough(spark):
    """The reference's Tripole CRS (variable/crs.py:836-850) is a
    metadata tag on a spherical lon/lat system — transform to/from
    geographic and parametric CRSs must treat it exactly like
    EPSG:4326 coordinates, and the tag must stay queryable."""
    tri = {"proj": "tripole", "R": 6370997.0}
    assert crs.is_tripole(tri) and not crs.is_tripole({"proj": "longlat"})
    df = spark.createDataFrame(
        [(-97.0, 47.5), (10.0, -30.0)], "lon double, lat double"
    )
    out = crs.transform_crs(df, tri, "EPSG:4326").collect()
    for r in out:
        assert r["x"] == r["lon"] and r["y"] == r["lat"]
    # composes with a parametric CRS exactly like geographic does
    lcc = dict(LCC_NARCCAP)
    a = crs.transform_crs(df, tri, lcc).collect()
    b = crs.transform_crs(df, "EPSG:4326", lcc).collect()
    assert [(r["x"], r["y"]) for r in a] == [(r["x"], r["y"]) for r in b]
