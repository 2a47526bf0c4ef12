"""Temporal grouping goldens (seasonal DJF year shift, month repr day 16)
and kNN tie-break/expansion semantics."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from ocgis_spark.fixtures import GOLDEN_GRID
from ocgis_spark.operators import knn, temporal, windows


@pytest.fixture(scope="module")
def multi_month(spark):
    """Daily series Nov 2000 .. Feb 2001 (crosses the DJF year boundary)."""
    start = dt.datetime(2000, 11, 1, 12)
    rows = [
        (i, start + dt.timedelta(days=i), float(i % 7))
        for i in range(120)
    ]
    return spark.createDataFrame(rows, "id int, ts timestamp, value double")


def test_seasonal_djf_year_shift(spark, multi_month):
    out = {
        (r.season, r.season_year): r.n
        for r in temporal.group_season(multi_month).collect()
    }
    # Nov 2000 -> SON 2000; Dec 2000 -> DJF 2001 (year-shift); Jan/Feb 2001 -> DJF 2001
    assert out[("SON", 2000)] == 30
    assert out[("DJF", 2001)] == 31 + 31 + 28
    assert ("DJF", 2000) not in out


def test_month_grouping_repr_day16(spark, multi_month):
    out = temporal.group_month(multi_month).collect()
    reprs = {(r.year, r.month): r.repr_time for r in out}
    assert reprs[(2000, 12)] == dt.datetime(2000, 12, 16)
    ns = {(r.year, r.month): r.n for r in out}
    assert ns[(2001, 1)] == 31


def test_time_range_bounds_aware(spark, multi_month):
    """A row whose [lb, ub] interval OVERLAPS the range is kept even when
    its center is outside (Variable.get_between semantics)."""
    b = temporal.with_time_bounds(multi_month, hours=24)
    out = temporal.time_range(b, "2000-11-05 00:00:00", "2000-11-06 00:00:00")
    ids = sorted(r.id for r in out.collect())
    # centers 11-04 12:00 .. 11-06 12:00: their ±24h intervals overlap the
    # range (e.g. id=3's ub 11-05 12:00 >= range lo), id=2's ub is 11-04
    # 12:00 < 11-05 00:00 -> excluded
    assert ids == [3, 4, 5]


def test_knn_golden_tie_break(spark, golden_cells):
    """Point (-104.0, 38.5) is equidistant (0.5°) from 4 cell centroids;
    the reference's argmin takes the first in y-major order -> (1, 1)."""
    out = knn.knn_cells(golden_cells, GOLDEN_GRID, -104.0, 38.5, k=4).collect()
    assert (out[0].cell_y, out[0].cell_x) == (1, 1)
    # (-104.0, 38.5) sits ON centroid column cx=1: two cells at 0.5°, then
    # a 4-way tie at sqrt(1.25) broken by (cell_y, cell_x) ascending
    assert [r.dist for r in out] == pytest.approx([0.5, 0.5, 1.118033988749895,
                                                   1.118033988749895])
    assert [(r.cell_y, r.cell_x) for r in out] == [(1, 1), (2, 1), (1, 0), (1, 2)]


def test_knn_expands_past_sparse_rings(spark):
    """Only 2 cells exist, far from the query point: the ring expansion
    must widen until it finds them."""
    cells = spark.createDataFrame([(3, 3, 1.0), (0, 0, 1.0)],
                                  "cell_y int, cell_x int, value double")
    out = knn.knn_cells(cells, GOLDEN_GRID, -104.9, 37.1, k=2).collect()
    assert len(out) == 2
    assert (out[0].cell_y, out[0].cell_x) == (0, 0)


def test_freezethaw_transitions(spark):
    rows = [(1, dt.datetime(2000, 1, 1) + dt.timedelta(days=i), v)
            for i, v in enumerate([20.0, 20.0, 5.0, 5.0, 5.0, 30.0, 30.0, 1.0])]
    df = spark.createDataFrame(rows, "cell bigint, ts timestamp, value double")
    out = windows.freezethaw(df, "cell", "ts", "value", threshold=15.0).collect()
    # cumulative excursions: +5,+10,0,-10,-20 (flip to -), +-5, +10 (flip to +), -4 (flip to -)
    assert out[0].transitions == 3
