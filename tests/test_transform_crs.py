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
