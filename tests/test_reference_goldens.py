"""Reference test_simple goldens replayed on the 4x4/1-degree fixture
(``/root/reference/src/ocgis/test/test_simple/test_simple.py``). The
reference's `foo` variable holds the quadrant values 1/2/3/4 whose grid
mean is exactly 2.5 — the same layout as the golden_cells fixture."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from ocgis_spark.fixtures import GOLDEN_GRID
from ocgis_spark.geo import wkb as WKB
from ocgis_spark.ops import OcgOperations
from ocgis_spark.request import Field


def _golden_ts(spark, n_days=61, start="2000-03-01"):
    """golden 4x4 cells x n_days daily steps (reference make_test_data:
    61 days spanning March-April 2000 -> calc_grouping month/year gives
    2 groups)."""
    dates = pd.date_range(start, periods=n_days, freq="D")
    rows = []
    for ts in dates:
        for cy in range(4):
            for cx in range(4):
                north, east = cy >= 2, cx >= 2
                val = (1.0 if (north and not east) else 2.0 if north
                       else 3.0 if not east else 4.0)
                rows.append((ts, cy, cx,
                             -105.0 + cx * 1.0, 37.0 + cy * 1.0, val))
    pdf = pd.DataFrame(rows, columns=["ts", "cell_y", "cell_x", "lon", "lat",
                                      "value"])
    return spark.createDataFrame(pdf)


def _field(spark, df):
    return Field(df, {"time": "ts", "x": "lon", "y": "lat", "value": "value"},
                 GOLDEN_GRID)


def test_calc_with_spatial_aggregation_mean_is_2_5(spark):
    """test_simple.test_calc: mean calc grouped by month/year after
    aggregate=True -> every group's value is exactly 2.5."""
    df = _golden_ts(spark)
    ops = OcgOperations(
        dataset=_field(spark, df), aggregate=True,
        calc=[{"func": "mean", "name": "my_mean"}],
        calc_grouping=["month", "year"],
    )
    out = ops.execute(spark).toPandas()
    assert len(out) == 2  # March + April 2000
    assert np.allclose(out["my_mean"], 2.5)


def test_calc_eval_mean_6_5(spark):
    """test_simple.test_calc_eval: foo2 = foo + 4 -> mean 6.5."""
    df = _golden_ts(spark, n_days=4)
    ops = OcgOperations(dataset=_field(spark, df), calc=[{"func": "eval=foo2=value + 4.0"}])
    out = ops.execute(spark)
    assert out.agg(F.avg("foo2")).collect()[0][0] == pytest.approx(6.5)


def test_point_subset_search_radius(spark):
    """test_simple.test_point_subset: point geom buffered by
    search_radius_mult x resolution — 2.0 keeps the full 4x4 grid's cells,
    0.01 keeps exactly the one owning cell."""
    df = _golden_ts(spark, n_days=1)
    big = OcgOperations(
        dataset=_field(spark, df), geom=bytes(WKB.point_to_wkb(-103.5, 38.5)),
        spatial_operation="intersects", abstraction="polygon",
        keep_touches=True, search_radius_mult=2.0,
    ).execute(spark).toPandas()
    assert big[["cell_y", "cell_x"]].drop_duplicates().shape[0] == 16

    small = OcgOperations(
        dataset=_field(spark, df), geom=bytes(WKB.point_to_wkb(-103.0, 38.0)),
        spatial_operation="intersects", abstraction="polygon",
        search_radius_mult=0.01,
    ).execute(spark).toPandas()
    assert small[["cell_y", "cell_x"]].drop_duplicates().shape[0] == 1
    # the owning cell: (-103, 38) lies in cell_x=2, cell_y=1
    assert (small["cell_x"].iloc[0], small["cell_y"].iloc[0]) == (2, 1)


def test_aggregate_only_returns_2_5(spark):
    """test_simple.test_aggregate: unweighted spatial mean is 2.5."""
    df = _golden_ts(spark, n_days=1)
    out = OcgOperations(dataset=_field(spark, df), aggregate=True).execute(spark)
    row = out.collect()[0]
    assert row["wmean"] == pytest.approx(2.5)
    assert row["n"] == 16


def test_calc_multivariate_divide(spark):
    """test_simple.test_calc_multivariate: divide(var1, var2); grouped by
    month -> per-group mean of the quotient (golden: value/2 -> 1.25)."""
    df = _golden_ts(spark, n_days=40).withColumn("var2", F.lit(2.0))
    ops = OcgOperations(
        dataset=Field(df, {"time": "ts", "x": "lon", "y": "lat",
                           "value": "value"}, GOLDEN_GRID),
        calc=[{"func": "divide", "name": "divide",
               "kwds": {"arr1": "value", "arr2": "var2"}}],
        calc_grouping=["month"],
    )
    out = ops.execute(spark).toPandas()
    assert len(out) == 2  # the 40 days span 2 months
    assert np.allclose(out["divide"], 1.25)

    # ungrouped: row-level column, mean still 1.25
    ops2 = OcgOperations(
        dataset=Field(df, {"time": "ts", "x": "lon", "y": "lat",
                           "value": "value"}, GOLDEN_GRID),
        calc=[{"func": "divide", "name": "divide",
               "kwds": {"arr1": "value", "arr2": "var2"}}],
    )
    out2 = ops2.execute(spark)
    assert out2.agg(F.avg("divide")).collect()[0][0] == pytest.approx(1.25)


def test_snippet_time_region_combination(spark):
    """test_simple.test_snippet_time_region: both subsets compose."""
    df = _golden_ts(spark, n_days=61)
    ops = OcgOperations(
        dataset=Field(df, {"time": "ts", "x": "lon", "y": "lat",
                           "value": "value"}, GOLDEN_GRID),
        time_region={"month": [4]}, snippet=True,
    )
    out = ops.execute(spark).toPandas()
    # snippet keeps only the first remaining time step (April 1) x 16 cells
    assert len(out) == 16
    assert set(pd.to_datetime(out["ts"]).dt.month) == {4}
    assert set(pd.to_datetime(out["ts"]).dt.day) == {1}
