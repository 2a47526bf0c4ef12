"""Grid-density clustering (operators/cluster.py)."""

import pytest

from ocgis_spark.operators import cluster as CLU


def _pts(spark, rows):
    return spark.createDataFrame(rows, "pid int, lon double, lat double")


def _blob(pid0, lon0, lat0, n, spread=0.2):
    # deterministic points inside one-ish cell around (lon0, lat0)
    return [
        (pid0 + i,
         lon0 + (i * 37 % n) / n * spread,
         lat0 + (i * 53 % n) / n * spread)
        for i in range(n)
    ]


def test_grid_cluster_adjacent_cells_merge(spark):
    """Two dense blobs in ADJACENT 1-degree cells form one cluster; a
    distant blob is its own cluster; sparse stragglers are NULL noise."""
    rows = (
        _blob(0, 10.2, 50.2, 25)        # cell (10, 50)
        + _blob(100, 11.2, 50.6, 25)    # cell (11, 50) — adjacent
        + _blob(200, 40.5, -20.5, 30)   # far blob
        + [(900, 120.0, 10.0), (901, -60.0, -30.0)]  # noise
    )
    out = CLU.grid_cluster(_pts(spark, rows), cell_deg=1.0, min_pts=20)
    got = {r["pid"]: r for r in out.collect()}
    a = {got[i]["cluster_id"] for i in range(25)}
    b = {got[100 + i]["cluster_id"] for i in range(25)}
    c = {got[200 + i]["cluster_id"] for i in range(30)}
    assert len(a) == 1 and a == b          # merged across the cell edge
    assert len(c) == 1 and c != a
    assert got[900]["cluster_id"] is None
    assert got[901]["cluster_id"] is None
    # label is the component's MIN dense cell id (deterministic)
    cells_ab = {got[i]["cell_id"] for i in range(25)} | {
        got[100 + i]["cell_id"] for i in range(25)}
    assert a == {min(cells_ab)}


def test_grid_cluster_wraps_at_seam(spark):
    """A cluster straddling the antimeridian connects: cx wraps mod nx,
    so cells (179, *) and (-180, *) are adjacent."""
    rows = _blob(0, 179.55, 0.2, 25) + _blob(100, -179.9, 0.3, 25)
    out = CLU.grid_cluster(_pts(spark, rows), cell_deg=1.0, min_pts=20)
    got = {r["pid"]: r["cluster_id"] for r in out.collect()}
    labels = set(got.values())
    assert len(labels) == 1 and None not in labels


def test_grid_cluster_diagonal_and_isolated(spark):
    """Diagonal adjacency counts (8-neighborhood); an isolated dense
    cell labels itself."""
    rows = _blob(0, 10.2, 50.2, 22) + _blob(100, 11.2, 51.2, 22)
    out = CLU.grid_cluster(_pts(spark, rows), cell_deg=1.0, min_pts=20)
    got = {r["pid"]: r for r in out.collect()}
    assert got[0]["cluster_id"] == got[100]["cluster_id"]
    solo = _blob(0, 77.3, 33.3, 21)
    out2 = CLU.grid_cluster(_pts(spark, solo), cell_deg=1.0, min_pts=20)
    rows2 = out2.collect()
    assert {r["cluster_id"] for r in rows2} == {rows2[0]["cell_id"]}


def test_grid_cluster_validation():
    with pytest.raises(ValueError, match="divide 360"):
        CLU._grid_params(0.7)
    with pytest.raises(ValueError, match="positive"):
        CLU._grid_params(-1.0)


def test_grid_cluster_assignment_plan(spark):
    """The point->cluster assignment join broadcasts the cell table for
    small graticules, and no Python touches the corpus path."""
    rows = _blob(0, 10.2, 50.2, 25)
    out = CLU.grid_cluster(_pts(spark, rows), cell_deg=1.0, min_pts=20)
    plan = out._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
