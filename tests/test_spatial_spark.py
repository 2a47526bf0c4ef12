"""Spark-side golden tests replicating the reference's test_simple spatial
assertions (/root/reference/src/ocgis/test/test_simple/test_simple.py:552-599)
on the 4x4/1° grid, plus the non-convex UDF refine path vs a NumPy oracle."""

import pandas as pd
import numpy as np
import pytest
from pyspark.sql import functions as F

from ocgis_spark.fixtures import GOLDEN_GRID, rect_ring
from ocgis_spark.geo import geometry as G
from ocgis_spark.operators import aggregate as agg
from ocgis_spark.operators import spatial


def test_intersects_golden_quadrant(spark, golden_cells):
    rings = [rect_ring(-104.5, 37.5, -102.5, 39.5)]
    out = spatial.spatial_subset(
        spark, golden_cells, GOLDEN_GRID, rings,
        abstraction="polygon", keep_touches=False,
    )
    rows = {(r.cell_y, r.cell_x): r.value for r in out.collect()}
    assert rows == {(1, 1): 3.0, (1, 2): 4.0, (2, 1): 1.0, (2, 2): 2.0}


def test_clip_aggregate_golden(spark, golden_cells):
    """clip areas mean 0.25, union 1.0, area-weighted mean 2.5."""
    rings = [rect_ring(-104.0, 38.0, -103.0, 39.0)]
    clipped = spatial.spatial_subset(
        spark, golden_cells, GOLDEN_GRID, rings,
        operation="clip", abstraction="polygon",
    )
    res = agg.area_weighted_mean(clipped, "value", "clip_area").collect()[0]
    assert res["wmean"] == pytest.approx(2.5)
    assert res["union_area"] == pytest.approx(1.0)
    assert res["n"] == 4


def test_extent_error_on_empty(spark, golden_cells):
    rings = [rect_ring(50.0, 50.0, 51.0, 51.0)]
    with pytest.raises(spatial.ExtentError):
        spatial.spatial_subset(
            spark, golden_cells, GOLDEN_GRID, rings,
            abstraction="polygon", allow_empty=False,
        )
    out = spatial.spatial_subset(
        spark, golden_cells, GOLDEN_GRID, rings,
        abstraction="polygon", allow_empty=True,
    )
    assert out.count() == 0


def test_nonconvex_pip_udf_matches_numpy(spark):
    """L-shaped (non-convex) polygon exercises the pandas-UDF refine path;
    oracle = the same NumPy kernel applied driver-side."""
    ring = np.array(
        [[0, 0], [4, 0], [4, 2], [2, 2], [2, 4], [0, 4], [0, 0]], dtype="f8"
    )
    rng = np.random.default_rng(42)
    px = rng.uniform(-1, 5, 500)
    py = rng.uniform(-1, 5, 500)
    df = spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(zip(px, py))],
        "id int, lon double, lat double",
    )
    got = {
        r.id
        for r in spatial.refine_points(df, [ring], keep_touches=True).collect()
    }
    expected = set(
        np.nonzero(G.points_in_polygon(px, py, [ring], keep_touches=True))[0].tolist()
    )
    assert got == expected
    assert 0 < len(got) < 500


def test_clip_nonrect_udf_matches_numpy(spark, golden_cells):
    """Triangle clip exercises the Sutherland–Hodgman UDF path."""
    tri = [np.array([[-105.5, 36.5], [-101.5, 36.5], [-105.5, 40.5], [-105.5, 36.5]])]
    out = spatial.spatial_subset(
        spark, golden_cells, GOLDEN_GRID, tri,
        operation="clip", abstraction="polygon",
    ).collect()
    for r in out:
        minx, miny, maxx, maxy = GOLDEN_GRID.bounds(r.cell_y, r.cell_x)
        expect = G.box_polygon_clip_area(tri, minx, miny, maxx, maxy)
        assert r.clip_area == pytest.approx(expect, rel=1e-12)
    total = sum(r.clip_area for r in out)
    assert total == pytest.approx(8.0, rel=1e-9)  # half the 16 deg^2 grid


def test_optimized_bbox_matches_two_phase_for_rect(spark, golden_cells):
    df = golden_cells.withColumn(
        "lon", F.lit(-105.0) + F.col("cell_x") * 1.0
    ).withColumn("lat", F.lit(37.0) + F.col("cell_y") * 1.0)
    rect = (-104.5, 37.5, -102.5, 39.5)
    a = spatial.spatial_subset(
        spark, df, GOLDEN_GRID, [rect_ring(*rect)],
        abstraction="point", optimized_bbox=True,
    )
    b = spatial.spatial_subset(
        spark, df, GOLDEN_GRID, [rect_ring(*rect)], abstraction="point"
    )
    assert {(r.cell_y, r.cell_x) for r in a.collect()} == {
        (r.cell_y, r.cell_x) for r in b.collect()
    }


def test_split_covering_parity_and_interior_skip(spark):
    """covering_cells_split must (a) partition the covering, (b) contain
    no false interiors, and (c) leave spatial_subset results identical to
    the direct-PIP path on a non-convex ring."""
    import numpy as np

    from ocgis_spark.fixtures import DOC_GRID, QUERY_LSHAPE
    from ocgis_spark.geo import geometry as G
    from ocgis_spark.geo.cellindex import (
        covering_cells, covering_cells_split, zdecode,
    )

    rings = [QUERY_LSHAPE]
    cov = set(covering_cells(DOC_GRID, rings).tolist())
    int_z, bnd_z = covering_cells_split(DOC_GRID, rings)
    assert set(int_z.tolist()) | set(bnd_z.tolist()) == cov
    assert not (set(int_z.tolist()) & set(bnd_z.tolist()))
    assert len(int_z) > 0  # the L interior is many cells at 64x64
    # no false interior: every corner of every interior cell is inside
    cy, cx = zdecode(int_z)
    bminx, bminy, bmaxx, bmaxy = DOC_GRID.bounds(cy, cx)
    for xs, ys in [(bminx, bminy), (bmaxx, bminy), (bminx, bmaxy), (bmaxx, bmaxy)]:
        assert G.points_in_polygon(xs, ys, rings, True).all()

    # end-to-end parity: split path (spatial_subset) vs direct PIP
    rng = np.random.RandomState(11)
    n = 4000
    lon = rng.uniform(DOC_GRID.lon0, DOC_GRID.lon1, n)
    lat = rng.uniform(DOC_GRID.lat0, DOC_GRID.lat1, n)
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": np.arange(n), "lon": lon, "lat": lat})
    )
    enc = spatial.encode_cells(df, DOC_GRID)
    got = {
        r["doc_id"]
        for r in spatial.spatial_subset(
            spark, enc, DOC_GRID, rings, operation="intersects",
            abstraction="point", keep_touches=True,
        ).collect()
    }
    want = set(
        np.arange(n)[G.points_in_polygon(lon, lat, rings, True)].tolist()
    )
    assert got == want


def test_split_covering_ring_with_hole(spark):
    """A square annulus (outer ring + hole): interior split must exclude
    the hole and results must match direct ray-cast PIP."""
    import numpy as np

    from ocgis_spark.fixtures import DOC_GRID, rect_ring
    from ocgis_spark.geo import geometry as G

    outer = rect_ring(-105.0, 37.0, -102.0, 40.0)
    hole = rect_ring(-104.2, 37.8, -103.0, 39.2)
    rings = [outer, hole]
    rng = np.random.RandomState(3)
    n = 3000
    lon = rng.uniform(DOC_GRID.lon0, DOC_GRID.lon1, n)
    lat = rng.uniform(DOC_GRID.lat0, DOC_GRID.lat1, n)
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": np.arange(n), "lon": lon, "lat": lat})
    )
    enc = spatial.encode_cells(df, DOC_GRID)
    got = {
        r["doc_id"]
        for r in spatial.spatial_subset(
            spark, enc, DOC_GRID, rings, operation="intersects",
            abstraction="point", keep_touches=True,
        ).collect()
    }
    want = set(
        np.arange(n)[G.points_in_polygon(lon, lat, rings, True)].tolist()
    )
    assert got == want


def test_r4_review_spatial_regressions(spark):
    """Pins for the r4 spatial-core review findings (all were invisible to
    the non-aligned, closed-ring, on-grid oracle fixtures):
    1. covering includes west/south edge-touching cells (keep_touches
       symmetry); 2. open convex rings subset identically to their closed
       forms; 3. a duplicated consecutive vertex must not empty the
       keep_touches=False subset; 4. off-grid rows encode cell_id = -1;
    5. far-off-grid kNN probes return the true nearest cell."""
    import numpy as np

    from ocgis_spark.fixtures import GOLDEN_GRID, rect_ring
    from ocgis_spark.operators import knn, spatial

    g = GOLDEN_GRID
    rows = [(cy, cx, -105.0 + cx, 37.0 + cy, 1.0)
            for cy in range(4) for cx in range(4)]
    df = spark.createDataFrame(
        rows, "cell_y int, cell_x int, lon double, lat double, value double")

    ring = rect_ring(-104.5, 37.5, -103.5, 38.5)  # cell-edge aligned
    got = sorted((r.cell_y, r.cell_x) for r in spatial.spatial_subset(
        spark, df, g, [ring], abstraction="polygon", keep_touches=True
    ).collect())
    assert got == [(cy, cx) for cy in range(3) for cx in range(3)]

    open_ring = np.array([[-105.2, 37.2], [-103.0, 37.2], [-104.0, 39.5]])
    closed = np.vstack([open_ring, open_ring[:1]])
    a = sorted((r.cell_y, r.cell_x) for r in spatial.spatial_subset(
        spark, df, g, [open_ring], abstraction="point").collect())
    b = sorted((r.cell_y, r.cell_x) for r in spatial.spatial_subset(
        spark, df, g, [closed], abstraction="point").collect())
    assert a == b

    dup = np.array([[-105.2, 37.2], [-103.2, 37.2], [-103.2, 37.2],
                    [-103.2, 39.2], [-105.2, 39.2], [-105.2, 37.2]])
    assert spatial.spatial_subset(
        spark, df, g, [dup], abstraction="point", keep_touches=False
    ).count() == 4

    off = spark.createDataFrame(
        [(g.lon0 + (g.nx + 0.5) * g.res, g.lat0 + 0.5 * g.res)],
        "lon double, lat double")
    assert spatial.encode_cells(off, g).collect()[0]["cell_id"] == -1

    hits = knn.knn_cells(
        df.select("cell_y", "cell_x"), g, g.lon0 - 20.0, 38.0, k=1
    ).collect()
    assert len(hits) == 1 and hits[0]["cell_x"] == 0
