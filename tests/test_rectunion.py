"""Rectilinear polygon union (edge cancellation + left-turn tracing) —
the reference's ``get_unioned`` geometry output (``geom.py:870-1075``) and
the golden ``test_simple`` clip+aggregate union-area assertion."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from ocgis_spark.geo import geometry as G
from ocgis_spark.geo import rectunion as RU
from ocgis_spark.geo import wkb as WKB


def _boxes(specs):
    a = np.array(specs, dtype="f8")
    return a[:, 0], a[:, 1], a[:, 2], a[:, 3]


def test_single_box():
    polys = RU.union_boxes(*_boxes([(0, 0, 1, 1)]))
    assert len(polys) == 1 and len(polys[0]) == 1
    ring = polys[0][0]
    assert len(ring) == 5
    assert G.ring_area(ring) == 1.0  # CCW
    assert tuple(ring[0]) == (0.0, 0.0)  # canonical start


def test_row_of_cells_merges_collinear():
    polys = RU.union_boxes(*_boxes([(0, 0, 1, 1), (1, 0, 2, 1), (2, 0, 3, 1)]))
    ring = polys[0][0]
    assert len(ring) == 5  # interior edges cancelled, collinear merged
    assert G.ring_area(ring) == 3.0


def test_disjoint_boxes_multipolygon():
    polys = RU.union_boxes(*_boxes([(0, 0, 1, 1), (5, 5, 6, 6)]))
    assert len(polys) == 2
    assert RU.union_area(polys) == 2.0


def test_corner_touching_boxes_stay_separate_rings():
    polys = RU.union_boxes(*_boxes([(0, 0, 1, 1), (1, 1, 2, 2)]))
    assert len(polys) == 2
    assert RU.union_area(polys) == 2.0


def test_ring_of_boxes_has_hole():
    specs = []
    for i in range(3):
        for j in range(3):
            if not (i == 1 and j == 1):
                specs.append((i, j, i + 1, j + 1))
    polys = RU.union_boxes(*_boxes(specs))
    assert len(polys) == 1
    assert len(polys[0]) == 2  # outer + hole
    assert G.ring_area(polys[0][0]) == 9.0
    assert G.ring_area(polys[0][1]) == -1.0  # hole is CW
    assert RU.union_area(polys) == 8.0


def test_union_wkb_roundtrip():
    b = RU.union_wkb(*_boxes([(0, 0, 1, 1), (1, 0, 2, 1)]))
    kind, rings = WKB.parse_wkb(b)
    assert kind == "polygon"
    assert G.ring_area(rings[0]) == 2.0


def test_golden_clip_union_area_one(spark, golden_cells):
    """Reference test_simple golden: clip the 4x4/1-deg grid by a 1x1
    square -> union area exactly 1.0 and the union IS that square."""
    from ocgis_spark.fixtures import rect_ring
    from ocgis_spark.geo.cellindex import GridSpec
    from ocgis_spark.operators import aggregate as AG
    from ocgis_spark.operators import spatial

    gg = GridSpec()
    rect = (-104.0, 38.0, -103.0, 39.0)
    sub = spatial.spatial_subset(
        spark, golden_cells, gg, [rect_ring(*rect)], operation="clip",
        abstraction="polygon", keep_touches=False,
    )
    clamped = (
        sub.withColumn("cminx", F.greatest("lon_lb", F.lit(rect[0])))
        .withColumn("cminy", F.greatest("lat_lb", F.lit(rect[1])))
        .withColumn("cmaxx", F.least("lon_ub", F.lit(rect[2])))
        .withColumn("cmaxy", F.least("lat_ub", F.lit(rect[3])))
    )
    u = AG.union_geometry(
        clamped, keys=None, minx="cminx", miny="cminy",
        maxx="cmaxx", maxy="cmaxy",
    ).collect()[0]
    assert u["union_area"] == pytest.approx(1.0, abs=1e-12)
    kind, rings = WKB.parse_wkb(bytes(u["union_wkb"]))
    assert kind == "polygon" and len(rings) == 1
    assert len(rings[0]) == 5
    assert set(map(tuple, rings[0][:-1])) == {
        (-104.0, 38.0), (-103.0, 38.0), (-103.0, 39.0), (-104.0, 39.0)
    }


def test_union_geometry_per_ugid(spark, golden_cells):
    """agg_selection-style per-key dissolve: two ugids, separate unions."""
    import pandas as pd

    from ocgis_spark.operators import aggregate as AG

    pdf = pd.DataFrame({
        "ugid": [1, 1, 2],
        "lon_lb": [0.0, 1.0, 10.0], "lat_lb": [0.0, 0.0, 0.0],
        "lon_ub": [1.0, 2.0, 11.0], "lat_ub": [1.0, 1.0, 1.0],
    })
    u = AG.union_geometry(spark.createDataFrame(pdf), keys=["ugid"]).toPandas()
    u = u.sort_values("ugid").reset_index(drop=True)
    assert list(u["union_area"]) == [2.0, 1.0]
    assert list(u["n_vertices"]) == [5, 5]


def test_split_polygon_by_boxes_conserves_area():
    """Non-rect split: pentagon pieces over a 2x2 box grid sum to the
    pentagon area; every piece lies inside its box."""
    from ocgis_spark.fixtures import QUERY_PENTAGON

    boxes = []
    for x0 in (-106.0, -103.5):
        for y0 in (36.0, 38.75):
            boxes.append((x0, y0, x0 + 2.5, y0 + 2.75))
    pieces = G.split_polygon_by_boxes([QUERY_PENTAGON], boxes)
    total = sum(G.polygon_area(p) for _, p in pieces)
    assert total == pytest.approx(G.polygon_area([QUERY_PENTAGON]), rel=1e-12)
    for i, p in pieces:
        minx, miny, maxx, maxy = boxes[i]
        pts = np.vstack(p[0])
        assert pts[:, 0].min() >= minx - 1e-12 and pts[:, 0].max() <= maxx + 1e-12
        assert pts[:, 1].min() >= miny - 1e-12 and pts[:, 1].max() <= maxy + 1e-12


from hypothesis import given, settings
from hypothesis import strategies as st


@given(st.integers(min_value=0, max_value=100_000))
@settings(max_examples=60, deadline=None)
def test_union_of_random_grid_subset_conserves_area(seed):
    """Property: union of a random subset of grid cells has area == cell
    count (unit cells), rings close, outer areas positive."""
    rng = np.random.RandomState(seed)
    n = rng.randint(1, 7)
    taken = set()
    while len(taken) < rng.randint(1, n * n + 1):
        taken.add((rng.randint(0, n), rng.randint(0, n)))
    specs = [(float(x), float(y), float(x + 1), float(y + 1)) for x, y in taken]
    a = np.array(specs)
    polys = RU.union_boxes(a[:, 0], a[:, 1], a[:, 2], a[:, 3])
    assert RU.union_area(polys) == pytest.approx(len(taken), abs=1e-12)
    for p in polys:
        assert G.ring_area(p[0]) > 0
        for ring in p:
            assert (ring[0] == ring[-1]).all()


def test_disjointify_overlapping_boxes():
    """Overlapping selection rectangles must dissolve to the exact union
    area (union_boxes alone double-counts overlap — its edge cancellation
    assumes a disjoint partition)."""
    import numpy as np
    from ocgis_spark.geo import rectunion as RU

    # two rects overlapping in [1,2]x[1,2]
    minx = np.array([0.0, 1.0]); miny = np.array([0.0, 1.0])
    maxx = np.array([2.0, 3.0]); maxy = np.array([2.0, 3.0])
    polys = RU.union_boxes(*RU.disjointify_boxes(minx, miny, maxx, maxy))
    assert RU.union_area(polys) == pytest.approx(4.0 + 4.0 - 1.0)
    # disjoint inputs pass through unchanged in area
    minx2 = np.array([0.0, 5.0]); maxx2 = np.array([1.0, 6.0])
    miny2 = np.array([0.0, 0.0]); maxy2 = np.array([1.0, 1.0])
    polys2 = RU.union_boxes(*RU.disjointify_boxes(minx2, miny2, maxx2, maxy2))
    assert len(polys2) == 2
    assert RU.union_area(polys2) == pytest.approx(2.0)


def test_agg_selection_clip_facade(spark):
    """ops facade: agg_selection + clip dissolves rectilinear selections;
    total clipped area over a full cell grid equals the union area."""
    import numpy as np
    from pyspark.sql import functions as F
    from ocgis_spark.fixtures import GOLDEN_GRID
    from ocgis_spark.ops import DefinitionValidationError, OcgOperations
    from ocgis_spark.request import Field

    g = GOLDEN_GRID
    cells = spark.range(g.nx * g.ny).select(
        (F.col("id") % g.nx).cast("int").alias("cell_x"),
        F.floor(F.col("id") / g.nx).cast("int").alias("cell_y"),
    ).withColumn("lon", F.lit(g.lon0) + (F.col("cell_x") + 0.5) * g.res) \
     .withColumn("lat", F.lit(g.lat0) + (F.col("cell_y") + 0.5) * g.res) \
     .withColumn("value", F.lit(1.0))
    fld = Field(cells, {"x": "lon", "y": "lat", "value": "value"}, g)
    # two overlapping interior rects
    r1 = (-105.2, 37.2, -103.7, 38.7)
    r2 = (-104.2, 38.2, -102.7, 39.7)
    ops = OcgOperations(dataset=fld, geom=[r1, r2], agg_selection=True,
                        spatial_operation="clip", abstraction="polygon")
    out = ops.execute(spark)
    total = out.agg(F.sum("clip_area")).collect()[0][0]
    want = 1.5 * 1.5 * 2 - 0.5 * 0.5  # union area by inclusion-exclusion
    assert total == pytest.approx(want, abs=1e-9)
    # OVERLAPPING non-rectilinear CONVEX selection (r4 session 2): the
    # half-plane difference decomposition dissolves rect + triangle;
    # union area by inclusion-exclusion: 2.25 + 0.5 - 0.32 (the triangle
    # part above y=37.2 is a similar triangle of height 0.8)
    import ocgis_spark.geo.wkb as WKB
    tri = WKB.polygon_to_wkb([np.array(
        [[-105.0, 37.0], [-104.0, 37.0], [-104.5, 38.0], [-105.0, 37.0]])])
    ops2 = OcgOperations(dataset=fld, geom=[r1, tri], agg_selection=True,
                         spatial_operation="clip", abstraction="polygon")
    total2 = ops2.execute(spark).agg(F.sum("clip_area")).collect()[0][0]
    assert total2 == pytest.approx(2.25 + 0.5 - 0.32, abs=1e-9)
    # OVERLAPPING NON-CONVEX selection (r4 session 3): ear-clipping
    # triangulation feeds the same convex sweep. L-shape area 0.75;
    # overlap with r1 = 1.0x0.3 (lower arm above y=37.2) + 0.5x0.5
    # (upper arm) = 0.55; union = 2.25 + 0.75 - 0.55
    lshape = WKB.polygon_to_wkb([np.array(
        [[-105.0, 37.0], [-104.0, 37.0], [-104.0, 37.5], [-104.5, 37.5],
         [-104.5, 38.0], [-105.0, 38.0], [-105.0, 37.0]])])
    ops2b = OcgOperations(dataset=fld, geom=[r1, lshape], agg_selection=True,
                          spatial_operation="clip", abstraction="polygon")
    total2b = ops2b.execute(spark).agg(F.sum("clip_area")).collect()[0][0]
    assert total2b == pytest.approx(2.25 + 0.75 - 0.55, abs=1e-9)
    # OVERLAPPING selection WITH A HOLE (r4 session 4): trapezoid
    # decomposition feeds the same convex sweep. The hole straddles r1's
    # south edge (y=37.2) so even-odd semantics are discriminated: the
    # hole part INSIDE r1 (0.4 x 0.25) re-enters the union through r1's
    # pieces; the part OUTSIDE (0.4 x 0.15) stays excluded. Union =
    # area(r1 ∪ outer) − hole\r1 = (2.25 + 1.0 − 0.8) − 0.06 = 2.39
    holed = WKB.polygon_to_wkb([
        np.array([[-105.0, 37.0], [-104.0, 37.0], [-104.0, 38.0],
                  [-105.0, 38.0], [-105.0, 37.0]]),
        np.array([[-104.7, 37.05], [-104.3, 37.05], [-104.3, 37.45],
                  [-104.7, 37.45], [-104.7, 37.05]]),
    ])
    ops2c = OcgOperations(dataset=fld, geom=[r1, holed], agg_selection=True,
                          spatial_operation="clip", abstraction="polygon")
    total2c = ops2c.execute(spark).agg(F.sum("clip_area")).collect()[0][0]
    assert total2c == pytest.approx(2.39, abs=1e-9)
    # DISJOINT non-rectilinear selections clip per-geometry (r4: the
    # common get_unioned case — distinct irregular regions): total area
    # = rect + triangle
    tri2 = WKB.polygon_to_wkb([np.array(
        [[-102.9, 37.0], [-102.0, 37.0], [-102.45, 37.9], [-102.9, 37.0]])])
    ops3 = OcgOperations(dataset=fld, geom=[r1, tri2], agg_selection=True,
                         spatial_operation="clip", abstraction="polygon")
    total3 = ops3.execute(spark).agg(F.sum("clip_area")).collect()[0][0]
    want3 = 1.5 * 1.5 + 0.5 * 0.9 * 0.9
    assert total3 == pytest.approx(want3, abs=1e-9)


def test_corner_touching_holes_split_into_simple_rings():
    """Regression (r4 review): two holes meeting at a corner traced as ONE
    figure-eight ring (visits the pinch vertex twice — OGC-invalid). The
    pinch split must emit two simple hole rings; union area unchanged."""
    import numpy as np

    from ocgis_spark.geo import geometry as G
    from ocgis_spark.geo import rectunion as RU

    cells = [(x, y) for x in range(4) for y in range(4)
             if (x, y) not in ((1, 1), (2, 2))]
    mx = np.array([c[0] for c in cells], float)
    my = np.array([c[1] for c in cells], float)
    polys = RU.union_boxes(mx, my, mx + 1, my + 1)
    assert len(polys) == 1
    outer, holes = polys[0][0], polys[0][1:]
    assert len(holes) == 2
    for r in polys[0]:
        pts = list(map(tuple, r[:-1]))
        assert len(set(pts)) == len(pts), "self-intersecting ring"
    net = abs(G.ring_area(outer)) - sum(abs(G.ring_area(h)) for h in holes)
    assert net == 14.0
