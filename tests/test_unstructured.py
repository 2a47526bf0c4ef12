"""Unstructured (UGRID-style) mesh subset: nodes + connectivity -> element
polygons, replicating the golden structured results on an equivalent mesh
(reference geomc.py semantics incl. the no_touching rule)."""

import pytest
from pyspark.sql import functions as F

from ocgis_spark.fixtures import rect_ring
from ocgis_spark.geo import unstructured as U


@pytest.fixture(scope="module")
def quad_mesh(spark):
    """5x5 nodes / 4x4 quad elements == the golden 4x4 grid as a mesh.
    Node (r, c) at lon -105.5 + c, lat 36.5 + r; element id = cy*4+cx."""
    nodes = [
        (r * 5 + c, -105.5 + c * 1.0, 36.5 + r * 1.0)
        for r in range(5) for c in range(5)
    ]
    elems = []
    for cy in range(4):
        for cx in range(4):
            n0 = cy * 5 + cx
            elems.append((cy * 4 + cx, [n0, n0 + 1, n0 + 6, n0 + 5]))
    ndf = spark.createDataFrame(nodes, "node_id bigint, x double, y double")
    edf = spark.createDataFrame(elems, "elem_id bigint, cindex array<bigint>")
    return edf, ndf


def test_element_bounds(spark, quad_mesh):
    edf, ndf = quad_mesh
    b = {r.elem_id: (r.minx, r.miny, r.maxx, r.maxy)
         for r in U.element_bounds(edf, ndf).collect()}
    assert b[0] == (-105.5, 36.5, -104.5, 37.5)
    assert b[15] == (-102.5, 39.5, -101.5, 40.5)


def test_unstruct_intersects_golden(spark, quad_mesh):
    """Same ugid=1 polygon -> same 2x2 element block, touching elements
    dropped (no_touching / keep_touches=False)."""
    edf, ndf = quad_mesh
    rings = [rect_ring(-104.5, 37.5, -102.5, 39.5)]
    kept = {r.elem_id for r in
            U.subset_elements(edf, ndf, rings, keep_touches=False).collect()}
    # elements (cy, cx) in {1,2}x{1,2}: ids 5, 6, 9, 10
    assert kept == {5, 6, 9, 10}


def test_unstruct_keep_touches_widens(spark, quad_mesh):
    edf, ndf = quad_mesh
    rings = [rect_ring(-104.5, 37.5, -102.5, 39.5)]
    kept = {r.elem_id for r in
            U.subset_elements(edf, ndf, rings, keep_touches=True).collect()}
    assert kept == set(range(16))  # every element at least touches


def test_unstruct_clip_areas(spark, quad_mesh):
    edf, ndf = quad_mesh
    rings = [rect_ring(-104.0, 38.0, -103.0, 39.0)]  # golden ugid=2
    out = {r.elem_id: r.clip_area for r in
           U.subset_elements(edf, ndf, rings, operation="clip").collect()}
    assert sorted(out) == [5, 6, 9, 10]
    for a in out.values():
        assert a == pytest.approx(0.25)


def test_unstruct_triangle_elements(spark):
    """Triangle mesh: two triangles splitting the unit square."""
    nodes = [(0, 0.0, 0.0), (1, 1.0, 0.0), (2, 1.0, 1.0), (3, 0.0, 1.0)]
    elems = [(0, [0, 1, 2]), (1, [0, 2, 3])]
    ndf = spark.createDataFrame(nodes, "node_id bigint, x double, y double")
    edf = spark.createDataFrame(elems, "elem_id bigint, cindex array<bigint>")
    rings = [rect_ring(0.6, 0.0, 1.0, 0.4)]  # lower-right corner
    out = {r.elem_id: r.clip_area for r in
           U.subset_elements(edf, ndf, rings, operation="clip").collect()}
    assert set(out) == {0}
    # triangle 0 is x>=y half; rect [0.6,1]x[0,0.4] lies fully in it
    assert out[0] == pytest.approx(0.16)


def test_scrip_corners_to_mesh_roundtrip(spark, quad_mesh):
    """SCRIP-style corner arrays -> mesh; subset result identical to the
    directly built connectivity mesh."""
    from ocgis_spark.fixtures import rect_ring

    corners = []
    for cy in range(4):
        for cx in range(4):
            x0, y0 = -105.5 + cx, 36.5 + cy
            corners.append(
                (cy * 4 + cx,
                 [x0, x0 + 1.0, x0 + 1.0, x0],
                 [y0, y0, y0 + 1.0, y0 + 1.0])
            )
    cdf = spark.createDataFrame(
        corners,
        "elem_id bigint, corner_lons array<double>, corner_lats array<double>",
    )
    elems, nodes = U.corners_to_mesh(cdf)
    assert nodes.count() == 25  # shared corners deduplicated
    rings = [rect_ring(-104.5, 37.5, -102.5, 39.5)]
    kept = {r.elem_id for r in
            U.subset_elements(elems, nodes, rings, keep_touches=False).collect()}
    assert kept == {5, 6, 9, 10}


def test_field_write_and_mask_semantics(spark, tmp_path):
    """Field.write via converter registry + value_mask -> NULL filtering
    (the mask cascade as a WHERE, SURVEY §1.4)."""
    import json

    from pyspark.sql import functions as F

    from ocgis_spark.request import Field

    df = spark.createDataFrame(
        [(0, 1.0, False), (1, 2.0, True), (2, 3.0, False)],
        "cell bigint, value double, value_mask boolean",
    )
    unmasked = df.filter(~F.col("value_mask"))
    fld = Field(unmasked, {"value": "value"}, None)
    path = fld.write(str(tmp_path / "fld_out"))
    back = spark.read.parquet(path)
    assert back.count() == 2 and back.agg(F.avg("value")).collect()[0][0] == 2.0
    meta = json.load(open(path + ".conv_meta.json"))
    assert "dimension_map" in meta["operations"]


def test_no_touching_decomposition_no_duplicates(spark):
    """no_touching rule (geomc.py:472-633): a 2x2 chunk decomposition of a
    quad mesh assigns every element to exactly one chunk even though
    boundary elements touch two chunk bboxes."""
    import pandas as pd

    from ocgis_spark.geo import unstructured as U

    # 6x6 unit-cell mesh over [0,6]^2
    rows = []
    for j in range(6):
        for i in range(6):
            rows.append({
                "elem_id": j * 6 + i,
                "corner_lons": [float(i), float(i + 1), float(i + 1), float(i)],
                "corner_lats": [float(j), float(j), float(j + 1), float(j + 1)],
            })
    corners = spark.createDataFrame(pd.DataFrame(rows))
    elems, nodes = U.corners_to_mesh(corners)

    chunks = [
        (0, (0.0, 0.0, 3.0, 3.0)), (1, (3.0, 0.0, 6.0, 3.0)),
        (2, (0.0, 3.0, 3.0, 6.0)), (3, (3.0, 3.0, 6.0, 6.0)),
    ]
    out = U.decompose_elements(elems, nodes, chunks).toPandas()
    assert len(out) == 36  # full coverage
    assert out["elem_id"].is_unique  # zero duplicates
    # interior elements go to their containing chunk; boundary-touching
    # elements to the smallest chunk id
    got = dict(zip(out.elem_id, out.chunk_id))
    assert got[0] == 0   # strictly inside chunk 0
    assert got[2] == 0   # spans [2,3]: touches chunk 1's edge -> smallest id
    assert got[3] == 0   # spans [3,4]: touches chunk 0's edge -> smallest id
    assert got[4] == 1   # spans [4,5]: strictly inside chunk 1
    assert got[35] == 3  # strictly inside chunk 3


def test_concave_element_scores_exact_clip_area():
    """Regression (r4 review): concave mesh faces (UGRID permits them) got
    silently wrong areas from the convex half-plane kernel (0.333 vs the
    true 1.0 on this case); the ear-clipping rescore must be exact."""
    import numpy as np
    import pandas as pd

    from ocgis_spark.geo import geometry as G
    from ocgis_spark.geo import unstructured as U

    sel = [np.array([[0.5, 0.5], [6.0, 0.5], [6.0, 6.0], [0.5, 6.0],
                     [0.5, 0.5]])]
    xs = pd.Series([[0.0, 4.0, 1.0, 0.0], [2.0, 4.0, 4.0, 2.0]])
    ys = pd.Series([[0.0, 0.0, 1.0, 4.0], [2.0, 2.0, 4.0, 4.0]])
    got = U.score_elements_batch(sel, xs, ys, keep_touches=False)
    truth = G.box_polygon_clip_area(
        [np.array([[0.0, 0.0], [4.0, 0.0], [1.0, 1.0], [0.0, 4.0],
                   [0.0, 0.0]])], 0.5, 0.5, 6.0, 6.0)
    assert abs(got[0] - truth) < 1e-9
    assert abs(got[1] - 4.0) < 1e-9  # convex sibling unchanged
