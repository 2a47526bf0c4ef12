"""Native rotated-pole transform goldens (reference ``CFRotatedPole``,
``src/ocgis/variable/crs.py:1134``; subset detour ``ops/engine.py:413-437``;
exercised by ``test/test_ocgis/test_spatial/test_spatial_subset.py``)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from ocgis_spark.operators import crs

POLE = (-162.0, 39.25)  # CORDEX-Europe-like


def _df(spark, rlon, rlat):
    return spark.createDataFrame(
        pd.DataFrame({"lon": np.asarray(rlon, "f8"), "lat": np.asarray(rlat, "f8")})
    )


def test_anchor_points(spark):
    out = crs.transform_rotated_pole(
        _df(spark, [0.0, 0.0], [0.0, 90.0]), *POLE
    ).toPandas()
    # rotated origin -> (pole_lon +- 180, 90 - pole_lat)
    assert out["glon"].iloc[0] == pytest.approx(18.0, abs=1e-9)
    assert out["glat"].iloc[0] == pytest.approx(50.75, abs=1e-9)
    # rotated north pole -> the geographic pole position
    assert out["glon"].iloc[1] == pytest.approx(-162.0, abs=1e-9)
    assert out["glat"].iloc[1] == pytest.approx(39.25, abs=1e-6)


def test_unrotated_identity(spark):
    """pole at (180, 90) == no rotation."""
    rlon = [-10.0, 10.0, 170.0, -170.0]
    rlat = [20.0, -30.0, 5.0, 60.0]
    out = crs.transform_rotated_pole(_df(spark, rlon, rlat), 180.0, 90.0).toPandas()
    assert np.allclose(out["glon"], rlon, atol=1e-9)
    assert np.allclose(out["glat"], rlat, atol=1e-9)


def test_round_trip(spark):
    rng = np.random.RandomState(1)
    rlon = rng.uniform(-30, 30, 500)
    rlat = rng.uniform(-25, 25, 500)
    df = crs.transform_rotated_pole(_df(spark, rlon, rlat), *POLE)
    rl, rp = crs.lonlat_to_rotated(F.col("glon"), F.col("glat"), *POLE)
    back = df.withColumn("rlon2", rl).withColumn("rlat2", rp).toPandas()
    assert np.allclose(back["rlon2"], rlon, atol=1e-9)
    assert np.allclose(back["rlat2"], rlat, atol=1e-9)


def test_hand_computed_golden(spark):
    """Golden vs hand-computed spherical trig at one point."""
    rlon, rlat = 5.0, -3.0
    plon, plat = POLE
    rl, rp = np.radians(rlon), np.radians(rlat)
    sp, cp = np.sin(np.radians(plat)), np.cos(np.radians(plat))
    glat = np.degrees(np.arcsin(np.sin(rp) * sp + np.cos(rp) * np.cos(rl) * cp))
    glon = plon + np.degrees(
        np.arctan2(-np.cos(rp) * np.sin(rl),
                   np.sin(rp) * cp - np.cos(rp) * np.cos(rl) * sp)
    )
    if glon > 180:
        glon -= 360
    elif glon <= -180:
        glon += 360
    out = crs.transform_rotated_pole(_df(spark, [rlon], [rlat]), *POLE).toPandas()
    assert out["glon"].iloc[0] == pytest.approx(glon, abs=1e-12)
    assert out["glat"].iloc[0] == pytest.approx(glat, abs=1e-12)
