"""Unit tests for the pure-NumPy geometry kernel (no Spark needed).

Golden values mirror the reference's test_simple fixtures
(/root/reference/src/ocgis/test/test_simple/test_simple.py:552-577).
"""

import numpy as np
import pytest

from ocgis_spark.geo import geometry as G
from ocgis_spark.geo import wkb
from ocgis_spark.geo.cellindex import GridSpec, covering_cells, ring_cells, zdecode, zencode


def rect_ring(minx, miny, maxx, maxy):
    return np.array(
        [[minx, miny], [maxx, miny], [maxx, maxy], [minx, maxy], [minx, miny]], dtype="f8"
    )


GOLDEN = GridSpec()  # 4x4 @ 1 deg, extent [-105.5,-101.5]x[36.5,40.5]


def golden_value(cy, cx):
    # quadrant values 1 NW / 2 NE / 3 SW / 4 SE (make_test_data.py:61-65)
    north = cy >= 2
    east = cx >= 2
    return np.where(north, np.where(east, 2.0, 1.0), np.where(east, 4.0, 3.0))


def test_wkb_roundtrip():
    ring = rect_ring(-104.5, 37.5, -102.5, 39.5)
    buf = wkb.polygon_to_wkb([ring])
    kind, rings = wkb.parse_wkb(buf)
    assert kind == "polygon"
    np.testing.assert_allclose(rings[0], ring)
    assert wkb.wkb_bounds(buf) == (-104.5, 37.5, -102.5, 39.5)
    kind2, (x, y) = wkb.parse_wkb(wkb.point_to_wkb(-104.0, 38.5))
    assert kind2 == "point" and (x, y) == (-104.0, 38.5)
    mp = wkb.multipolygon_to_wkb([[ring], [rect_ring(0, 0, 1, 1)]])
    kind3, polys = wkb.parse_wkb(mp)
    assert kind3 == "multipolygon" and len(polys) == 2


def test_intersects_golden_ugid1():
    """ugid=1 poly lat (37.5,39.5) lon (-104.5,-102.5), polygon abstraction
    keep_touches=False -> the 2x2 block with values [[1,2],[3,4]]."""
    rings = [rect_ring(-104.5, 37.5, -102.5, 39.5)]
    yy, xx = np.meshgrid(np.arange(4), np.arange(4), indexing="ij")
    cy, cx = yy.ravel(), xx.ravel()
    minx, miny, maxx, maxy = GOLDEN.bounds(cy, cx)
    keep, areas = G.boxes_intersect_polygon(minx, miny, maxx, maxy, rings, keep_touches=False)
    kept = sorted(zip(cy[keep].tolist(), cx[keep].tolist()))
    assert kept == [(1, 1), (1, 2), (2, 1), (2, 2)]
    vals = sorted(golden_value(cy[keep], cx[keep]).tolist())
    assert vals == [1.0, 2.0, 3.0, 4.0]


def test_intersects_keep_touches_true_widens():
    rings = [rect_ring(-104.5, 37.5, -102.5, 39.5)]
    yy, xx = np.meshgrid(np.arange(4), np.arange(4), indexing="ij")
    cy, cx = yy.ravel(), xx.ravel()
    minx, miny, maxx, maxy = GOLDEN.bounds(cy, cx)
    keep, _ = G.boxes_intersect_polygon(minx, miny, maxx, maxy, rings, keep_touches=True)
    assert keep.sum() == 16  # every cell at least touches the box


def test_clip_golden_ugid2():
    """ugid=2 poly lat (38,39) lon (-104,-103): 4 cells, areas mean 0.25,
    area-weighted mean value 2.5, union area 1.0 (test_simple.py:560-577)."""
    rings = [rect_ring(-104.0, 38.0, -103.0, 39.0)]
    yy, xx = np.meshgrid(np.arange(4), np.arange(4), indexing="ij")
    cy, cx = yy.ravel(), xx.ravel()
    minx, miny, maxx, maxy = GOLDEN.bounds(cy, cx)
    keep, areas = G.boxes_intersect_polygon(minx, miny, maxx, maxy, rings, keep_touches=False)
    assert keep.sum() == 4
    np.testing.assert_allclose(areas[keep], 0.25)
    assert abs(areas[keep].sum() - 1.0) < 1e-12
    vals = golden_value(cy[keep], cx[keep])
    wmean = float((vals * areas[keep]).sum() / areas[keep].sum())
    assert wmean == pytest.approx(2.5)


def test_pip_triangle_boundary():
    tri = [np.array([[0, 0], [4, 0], [0, 4], [0, 0]], dtype="f8")]
    px = np.array([1.0, 2.0, 0.0, 3.9, 2.0])
    py = np.array([1.0, 2.0, 0.0, 3.9, 0.0])
    inside_kt = G.points_in_polygon(px, py, tri, keep_touches=True)
    assert inside_kt.tolist() == [True, True, True, False, True]
    inside_nt = G.points_in_polygon(px, py, tri, keep_touches=False)
    # (0,0) is a vertex -> boundary -> excluded when keep_touches=False
    assert inside_nt.tolist() == [True, False, False, False, False]


def test_clip_area_nonrect():
    tri = [np.array([[0, 0], [2, 0], [0, 2], [0, 0]], dtype="f8")]
    # unit box [0,1]^2 clipped by the triangle: area = 1 - 0 = ... triangle
    # covers the box except corner above x+y=2 -> full box is inside? box
    # corner (1,1) on hypotenuse; area of box∩tri = 1 - 0.0 = 1? No:
    # x+y<=2 holds on the whole box, equality only at (1,1) -> area 1.
    a = G.box_polygon_clip_area(tri, 0, 0, 1, 1)
    assert a == pytest.approx(1.0)
    a2 = G.box_polygon_clip_area(tri, 1, 1, 2, 2)
    assert a2 == pytest.approx(0.0, abs=1e-12)
    a3 = G.box_polygon_clip_area(tri, 0.5, 0.5, 1.5, 1.5)
    assert a3 == pytest.approx(1.0 - 0.5, rel=1e-9)  # cut corner triangle area 0.5


def test_zorder_roundtrip_and_covering():
    cy = np.array([0, 1, 2, 3, 1000])
    cx = np.array([3, 2, 1, 0, 4095])
    z = zencode(cy, cx)
    dy, dx = zdecode(z)
    assert (dy == cy).all() and (dx == cx).all()
    rings = [rect_ring(-104.5, 37.5, -102.5, 39.5)]
    cells = covering_cells(GOLDEN, rings)
    cyz, cxz = zdecode(cells)
    assert sorted(zip(cyz.tolist(), cxz.tolist())) == [
        (y, x) for y in range(0, 4) for x in range(0, 4)
    ]  # closed covering is SYMMETRIC: the selection edges sit exactly on
    # cell boundaries, so touching row/col 0 (west/south, the r4 ceil-1
    # fix) is included alongside touching row/col 3 (east/north)
    disk = ring_cells(GOLDEN, 1, 1, 1)
    dyy, dxx = zdecode(disk)
    assert sorted(zip(dyy.tolist(), dxx.tolist())) == [
        (y, x) for y in range(0, 3) for x in range(0, 3)
    ]


def test_batch_clip_matches_scalar_nonconvex():
    """VERDICT r1 #3: the batch Sutherland–Hodgman (boundary boxes) +
    center-PIP (interior boxes) kernel must agree with the scalar kernel."""
    rng = np.random.RandomState(11)
    ang = np.linspace(0, 2 * np.pi, 13)[:-1]
    rad = np.where(np.arange(12) % 2 == 0, 3.0, 1.2)
    star = np.c_[rad * np.cos(ang) + 2, rad * np.sin(ang) + 2]
    star = np.vstack([star, star[:1]])
    hole = np.array(
        [[1.7, 1.7], [2.3, 1.7], [2.3, 2.3], [1.7, 2.3], [1.7, 1.7]], "f8"
    )
    n = 2000
    minx = rng.uniform(-1, 4, n)
    miny = rng.uniform(-1, 4, n)
    maxx = minx + rng.uniform(0.01, 2, n)
    maxy = miny + rng.uniform(0.01, 2, n)
    for rings in ([star], [star, hole]):
        batch = G.batch_box_polygon_clip_areas(rings, minx, miny, maxx, maxy)
        scalar = np.array([
            G.box_polygon_clip_area(rings, minx[i], miny[i], maxx[i], maxy[i])
            for i in range(n)
        ])
        assert np.allclose(batch, scalar, rtol=1e-12, atol=1e-13)


def test_rings_overlap_cases():
    """Exact polygon-overlap gate for the disjoint-selection dissolve
    (r4): containment, edge-cross with no interior vertices, touching,
    identity, and disjointness."""
    import numpy as np

    from ocgis_spark.geo import geometry as G

    def sq(x0, y0, s):
        return [np.array(
            [[x0, y0], [x0 + s, y0], [x0 + s, y0 + s], [x0, y0 + s]], float
        )]

    assert not G.rings_overlap(sq(0, 0, 1), sq(2, 2, 1))
    assert G.rings_overlap(sq(0, 0, 1), sq(0.5, 0.5, 1))  # partial overlap
    assert G.rings_overlap(sq(0, 0, 1), sq(1, 0, 1))      # edge touch
    assert G.rings_overlap(sq(0, 0, 1), sq(0, 0, 1))      # identical
    assert G.rings_overlap(sq(-5, -5, 10), sq(0, 0, 1))   # containment
    assert G.rings_overlap(sq(0, 0, 1), sq(-5, -5, 10))   # contained
    # plus-sign cross: edges intersect, no vertex of either inside other
    r1 = [np.array([[0, 1], [3, 1], [3, 2], [0, 2]], float)]
    r2 = [np.array([[1, 0], [2, 0], [2, 3], [1, 3]], float)]
    assert G.rings_overlap(r1, r2)
    # concave C-shape whose bbox contains a disjoint square
    c = [np.array([[0, 0], [3, 0], [3, 1], [1, 1], [1, 3], [3, 3],
                   [3, 4], [0, 4]], float)]
    inner = [np.array([[1.8, 1.5], [2.5, 1.5], [2.5, 2.5], [1.8, 2.5]],
                      float)]
    assert not G.rings_overlap(c, inner)


# ---- convex union decomposition (overlapping agg_selection dissolve) ----


def _sq(x0, y0, s):
    import numpy as np

    return np.array(
        [[x0, y0], [x0 + s, y0], [x0 + s, y0 + s], [x0, y0 + s], [x0, y0]],
        dtype="f8",
    )


def test_clip_ring_by_halfplane_splits_square():
    import numpy as np

    from ocgis_spark.geo import geometry as G

    sq = _sq(0, 0, 2)
    a, b = np.array([1.0, -1.0]), np.array([1.0, 3.0])  # vertical line x=1, up
    left = G.clip_ring_by_halfplane(sq, a, b, keep_left=True)
    right = G.clip_ring_by_halfplane(sq, a, b, keep_left=False)
    assert abs(abs(G.ring_area(left)) - 2.0) < 1e-12
    assert abs(abs(G.ring_area(right)) - 2.0) < 1e-12
    # the two halves tile the square
    assert abs(abs(G.ring_area(left)) + abs(G.ring_area(right)) - 4.0) < 1e-12


def test_convex_union_pieces_overlapping_squares():
    from ocgis_spark.geo import geometry as G

    # two unit-4 squares overlapping in a 1x2 strip: union area = 4+4-2
    pieces = G.convex_union_pieces([_sq(0, 0, 2), _sq(1, 0, 2)])
    total = sum(abs(G.ring_area(p)) for p in pieces)
    assert abs(total - 6.0) < 1e-10
    # every piece is convex CCW (prereq for the clip-based area kernels)
    assert all(G.ring_is_convex_ccw(p) for p in pieces)


def test_convex_union_pieces_triple_overlap_and_containment():
    import numpy as np

    from ocgis_spark.geo import geometry as G

    big = _sq(0, 0, 4)
    inside = _sq(1, 1, 1)           # fully contained: contributes nothing
    hang = _sq(3, 3, 2)             # overlaps corner: contributes 4 - 1
    tri = np.array([[4, 0], [6, 0], [6, 2], [4, 0]], dtype="f8")  # edge-touch
    pieces = G.convex_union_pieces([big, inside, hang, tri])
    total = sum(abs(G.ring_area(p)) for p in pieces)
    assert abs(total - (16.0 + 3.0 + 2.0)) < 1e-10


def test_convex_union_pieces_disjoint_passthrough():
    from ocgis_spark.geo import geometry as G

    pieces = G.convex_union_pieces([_sq(0, 0, 1), _sq(5, 5, 2)])
    total = sum(abs(G.ring_area(p)) for p in pieces)
    assert abs(total - 5.0) < 1e-12
    assert len(pieces) == 2


def test_convex_union_pieces_rejects_nonconvex():
    import numpy as np
    import pytest

    from ocgis_spark.geo import geometry as G

    lshape = np.array(
        [[0, 0], [2, 0], [2, 1], [1, 1], [1, 2], [0, 2], [0, 0]], dtype="f8"
    )
    with pytest.raises(ValueError):
        G.convex_union_pieces([lshape])


def test_convex_union_pieces_cw_input_reoriented():
    from ocgis_spark.geo import geometry as G

    cw = _sq(0, 0, 2)[::-1].copy()  # clockwise orientation
    pieces = G.convex_union_pieces([cw, _sq(1, 1, 2)])
    total = sum(abs(G.ring_area(p)) for p in pieces)
    assert abs(total - (4 + 4 - 1)) < 1e-10


def test_convex_union_pieces_no_degenerate_vertices():
    """rect + right-triangle whose dissolve fragment has a clip plane
    through a subject vertex: the raw S-H output repeats that corner, and
    the repeated-corner triangle (4 stored points all on bbox corners)
    must neither survive in the output nor classify as an axis rect —
    r4 regression: full-cell clip areas for cells outside the piece."""
    import numpy as np

    from ocgis_spark.geo import geometry as G

    rect = np.array(
        [[-104.5, 37.5], [-102.5, 37.5], [-102.5, 39.5], [-104.5, 39.5],
         [-104.5, 37.5]]
    )
    tri = np.array(
        [[-103.5, 38.5], [-101.5, 38.5], [-103.5, 40.5], [-103.5, 38.5]]
    )
    pieces = G.convex_union_pieces([rect, tri])
    total = sum(abs(G.ring_area(p)) for p in pieces)
    assert abs(total - 5.0) < 1e-10
    for p in pieces:
        # no consecutive duplicate vertices in any emitted piece
        assert (np.abs(p[1:] - p[:-1]).max(axis=1) > 0).all()
    # a corner-duplicated triangle is NOT an axis rect
    degenerate = np.array(
        [[-102.5, 39.5], [-102.5, 39.5], [-103.5, 40.5], [-103.5, 39.5],
         [-102.5, 39.5]]
    )
    assert not G._rings_is_axis_rect([degenerate])
    # cell entirely above the hypotenuse clips to zero area vs every piece
    keep, area = G.boxes_intersect_polygon(
        np.array([-102.8125]), np.array([40.0]),
        np.array([-102.75]), np.array([40.0625]),
        [pieces[2]], keep_touches=False,
    )
    assert not keep[0] and area[0] == 0.0


def test_triangulate_ring_chevron_and_convex_decompose():
    import numpy as np
    import pytest

    from ocgis_spark.geo import geometry as G

    chev = np.array(
        [[0, 0], [4, 0], [4, 3], [2, 1], [0, 3], [0, 0]], dtype="f8"
    )
    tris = G.triangulate_ring(chev)
    assert len(tris) == 3
    total = sum(abs(G.ring_area(t)) for t in tris)
    assert abs(total - abs(G.ring_area(chev))) < 1e-12
    assert all(G.ring_is_convex_ccw(t) for t in tris)
    # CW input reorients; convex input passes through unsplit
    tris_cw = G.triangulate_ring(chev[::-1].copy())
    assert abs(sum(abs(G.ring_area(t)) for t in tris_cw) - total) < 1e-12
    assert len(G.convex_decompose(_sq(0, 0, 2))) == 1
    assert len(G.convex_decompose(chev)) == 3
    # collinear vertex is dropped, not an infinite loop
    col = np.array(
        [[0, 0], [1, 0], [2, 0], [2, 2], [0, 2], [0, 0]], dtype="f8"
    )
    t2 = G.triangulate_ring(col)
    assert abs(sum(abs(G.ring_area(t)) for t in t2) - 4.0) < 1e-12
    # self-intersecting bowtie raises rather than silently mis-tiling
    bow = np.array([[0, 0], [2, 2], [2, 0], [0, 2], [0, 0]], dtype="f8")
    with pytest.raises(ValueError):
        G.triangulate_ring(bow)


def test_convex_union_pieces_accepts_triangulated_concave():
    import numpy as np

    from ocgis_spark.geo import geometry as G

    # concave chevron (area 8) overlapping a square (area 4) in a 1x2
    # strip entirely below the notch: union = 8 + 4 - 2
    chev = np.array(
        [[0, 0], [4, 0], [4, 3], [2, 1], [0, 3], [0, 0]], dtype="f8"
    )
    sq = _sq(3, -1, 2)  # [3,5]x[-1,1]: overlap [3,4]x[0,1] = 1? -> compute
    pieces = G.convex_union_pieces(G.convex_decompose(chev) + [sq])
    total = sum(abs(G.ring_area(p)) for p in pieces)
    # overlap of sq with chevron: x in [3,4], y in [0,1]; notch line at
    # x>=2 is y = x - ... chevron edge B(4,0)->C(4,3) vertical; notch
    # edges meet at (2,1): right notch edge from (4,3) to (2,1) is
    # y = x - 1, so inside-chevron requires y <= x - 1 OR y below?
    # chevron interior = bbox minus notch triangle {y > x-1 and y > -x+3}
    # overlap strip [3,4]x[0,1]: notch needs y > x-1 (>=2) -> inactive;
    # full 1x1 square inside chevron minus nothing = 1.0
    assert abs(total - (8.0 + 4.0 - 1.0)) < 1e-10
    assert all(G.ring_is_convex_ccw(p) for p in pieces)


def test_trapezoid_decompose_square_with_hole():
    import numpy as np

    from ocgis_spark.geo import geometry as G

    outer = _sq(0, 0, 4)
    hole = np.array([[1, 1], [2, 1], [2, 3], [1, 3], [1, 1]], dtype="f8")
    pieces = G.trapezoid_decompose([outer, hole])
    total = sum(abs(G.ring_area(p)) for p in pieces)
    assert abs(total - (16.0 - 2.0)) < 1e-10
    # every piece is convex CCW (prereq for convex_union_pieces and the
    # clip-based area kernels)
    assert all(G.ring_is_convex_ccw(p) for p in pieces)
    # no piece intrudes into the hole: clip each piece to the hole box
    hole_elem = np.array(
        [[[1, 1], [2, 1], [2, 3], [1, 3]]], dtype="f8"
    )
    for p in pieces:
        a = G.batch_convex_clip_areas([p], hole_elem)[0]
        assert a < 1e-12


def test_trapezoid_decompose_nonconvex_outer_with_hole():
    import numpy as np

    from ocgis_spark.geo import geometry as G

    # L-shape (area 12) with a square hole (area 1) in its lower arm
    lshape = np.array(
        [[0, 0], [4, 0], [4, 2], [2, 2], [2, 4], [0, 4], [0, 0]],
        dtype="f8",
    )
    hole = np.array(
        [[2.5, 0.5], [3.5, 0.5], [3.5, 1.5], [2.5, 1.5], [2.5, 0.5]],
        dtype="f8",
    )
    pieces = G.polygon_convex_pieces([lshape, hole])
    total = sum(abs(G.ring_area(p)) for p in pieces)
    assert abs(total - 11.0) < 1e-10
    assert all(G.ring_is_convex_ccw(p) for p in pieces)


def test_trapezoid_decompose_bowtie_raises():
    import numpy as np
    import pytest

    from ocgis_spark.geo import geometry as G

    bow = np.array([[0, 0], [2, 2], [2, 0], [0, 2], [0, 0]], dtype="f8")
    # force the trapezoid path by passing a hole alongside the bowtie
    hole = np.array(
        [[0.9, 0.9], [1.1, 0.9], [1.1, 1.1], [0.9, 1.1], [0.9, 0.9]],
        dtype="f8",
    )
    with pytest.raises(ValueError):
        G.trapezoid_decompose([bow, hole])


def test_polygon_convex_pieces_dispatch_and_union_with_holes():
    import numpy as np

    from ocgis_spark.geo import geometry as G

    # single-ring input dispatches to the ear-clip path (3 triangles)
    chev = np.array(
        [[0, 0], [4, 0], [4, 3], [2, 1], [0, 3], [0, 0]], dtype="f8"
    )
    assert len(G.polygon_convex_pieces([chev])) == 3
    # two overlapping HOLED squares through the full union sweep: squares
    # [0,4]^2 and [2,6]x[0,4], each with a 1x1 hole; A's hole at
    # [1,2]x[1,2] (outside B -> stays excluded), B's hole at [3,4]x[1,2]
    # (inside A -> re-enters the union through A's pieces).
    # union = 4*6 - 1 (A's hole only) = 23
    a = [_sq(0, 0, 4),
         np.array([[1, 1], [2, 1], [2, 2], [1, 2], [1, 1]], dtype="f8")]
    b = [np.array([[2, 0], [6, 0], [6, 4], [2, 4], [2, 0]], dtype="f8"),
         np.array([[3, 1], [4, 1], [4, 2], [3, 2], [3, 1]], dtype="f8")]
    pieces = G.convex_union_pieces(
        G.polygon_convex_pieces(a) + G.polygon_convex_pieces(b)
    )
    total = sum(abs(G.ring_area(p)) for p in pieces)
    assert abs(total - 23.0) < 1e-10


def test_dissolve_union_area_fuzz_vs_raster():
    """Independent oracle for the full dissolve stack (trapezoid/ear
    decomposition + half-plane union sweep): union area of random holed
    boxes and random convex polygons vs a fine-grid rasterization of the
    same even-odd/union semantics."""
    import numpy as np

    from ocgis_spark.geo import geometry as G

    rng = np.random.default_rng(20260817)
    for trial in range(6):
        polys = []  # list of ring-lists
        for _ in range(rng.integers(2, 5)):
            kind = rng.integers(0, 2)
            x0, y0 = rng.uniform(0, 6, 2)
            w, h = rng.uniform(1.5, 4, 2)
            if kind == 0:
                # axis box with a strictly interior hole
                hx0 = x0 + w * rng.uniform(0.15, 0.4)
                hy0 = y0 + h * rng.uniform(0.15, 0.4)
                hw = w * rng.uniform(0.15, 0.35)
                hh = h * rng.uniform(0.15, 0.35)
                outer = np.array([[x0, y0], [x0 + w, y0], [x0 + w, y0 + h],
                                  [x0, y0 + h], [x0, y0]])
                hole = np.array([[hx0, hy0], [hx0 + hw, hy0],
                                 [hx0 + hw, hy0 + hh], [hx0, hy0 + hh],
                                 [hx0, hy0]])
                polys.append([outer, hole])
            else:
                # random convex polygon (hull of random points)
                pts = np.column_stack([
                    x0 + rng.uniform(0, w, 12), y0 + rng.uniform(0, h, 12)
                ])
                c = pts.mean(axis=0)
                ang = np.arctan2(pts[:, 1] - c[1], pts[:, 0] - c[0])
                hullish = pts[np.argsort(ang)]
                # keep only hull vertices via cross-product filter
                keep = []
                m = len(hullish)
                for i in range(m):
                    a, b, cc = hullish[i - 1], hullish[i], hullish[(i + 1) % m]
                    if (b[0] - a[0]) * (cc[1] - a[1]) - (b[1] - a[1]) * (cc[0] - a[0]) > 1e-12:
                        keep.append(b)
                if len(keep) < 3:
                    continue
                ring = np.vstack(keep + [keep[0]])
                if not G.ring_is_convex_ccw(ring):
                    continue
                polys.append([ring])
        if len(polys) < 2:
            continue
        pieces = G.convex_union_pieces(
            [p for rings in polys for p in G.polygon_convex_pieces(rings)]
        )
        got = sum(abs(G.ring_area(p)) for p in pieces)
        # raster oracle: even-odd per polygon, OR across polygons
        n = 900
        xs = np.linspace(-0.5, 10.5, n)
        ys = np.linspace(-0.5, 10.5, n)
        X, Y = np.meshgrid(xs, ys)
        P = np.column_stack([X.ravel(), Y.ravel()])
        inside_any = np.zeros(len(P), dtype=bool)
        for rings in polys:
            inside = np.zeros(len(P), dtype=bool)
            for r in rings:
                inside ^= G.points_in_ring(P[:, 0], P[:, 1], r)
            inside_any |= inside
        cell = (xs[1] - xs[0]) * (ys[1] - ys[0])
        want = inside_any.sum() * cell
        # raster error ~ perimeter * pixel ≈ 0.04 * total edge length
        assert got == pytest.approx(want, abs=0.05 * max(got, 1.0) + 0.5)


def test_trapezoid_decompose_disjoint_components():
    """Even-odd over DISJOINT boundary components (the docstring's
    'multiple components need no bridging' claim): areas ADD — the
    tiling check must not mistake the second component for a hole."""
    import numpy as np

    from ocgis_spark.geo import geometry as G

    a = _sq(0, 0, 2)
    b = _sq(5, 5, 3)
    pieces = G.trapezoid_decompose([a, b])
    total = sum(abs(G.ring_area(p)) for p in pieces)
    assert abs(total - (4.0 + 9.0)) < 1e-10
    # and a three-level nest: outer - hole + island
    outer = _sq(0, 0, 8)
    hole = _sq(1, 1, 6)
    island = _sq(3, 3, 2)
    pieces = G.trapezoid_decompose([outer, hole, island])
    total = sum(abs(G.ring_area(p)) for p in pieces)
    assert abs(total - (64.0 - 36.0 + 4.0)) < 1e-10


def test_convex_union_no_double_count_left_apex_trapezoid():
    """Regression (r4 review): trapezoid_decompose of a left-apex triangle
    emits a trailing duplicate vertex ([a,b,c,a,a]); fed into
    convex_union_pieces (the holed-selection dissolve route), the
    zero-length closing edge read as an all-zero half-plane and the whole
    overlap region double-counted — A/B-verified 10.0 broken vs 8.5 fixed
    on exactly this input. Pinned on BOTH defenses: the dedupe drops the
    trailing run, and the sweep skips degenerate edges of stored pieces."""
    import numpy as np

    from ocgis_spark.geo import geometry as G

    tri = np.array([[0.0, 0.0], [2.0, -1.0], [2.0, 1.0], [0.0, 0.0]])
    # the raw trapezoid_decompose output shape, duplicate vertex included
    dup_tri = np.array(
        [[0.0, 0.0], [2.0, -1.0], [2.0, 1.0], [0.0, 0.0], [0.0, 0.0]]
    )
    d = G._dedupe_closed_ring(dup_tri)
    assert not ((d[1:] == d[:-1]).all(axis=1)).any() and len(d) == 4
    sq = np.array([[1.0, -2.0], [3.0, -2.0], [3.0, 2.0], [1.0, 2.0],
                   [1.0, -2.0]])
    for first in (dup_tri, *G.polygon_convex_pieces([tri])):
        pieces = G.convex_union_pieces([first, sq])
        total = sum(abs(G.ring_area(p)) for p in pieces)
        assert abs(total - 8.5) < 1e-9, (first, total)
    # trapezoid_decompose itself now emits clean rings
    for p in G.trapezoid_decompose([tri]):
        dd = G._dedupe_closed_ring(p)
        assert not ((dd[1:] == dd[:-1]).all(axis=1)).any()


def test_convex_union_pieces_triangle_fuzz_disjoint_and_exact():
    """Harder fuzz than the raster test: random TRIANGLES (whose trapezoid
    decomposition produces the left/right-apex duplicate-vertex pieces
    that hid the r4 double-count bug) unioned with random boxes. Asserts
    BOTH invariants exactly: (a) pieces are pairwise interior-disjoint
    (pairwise convex clip area ~ 0), (b) piece areas sum to the union
    area from an inclusion-exclusion-free independent oracle (fine-grid
    rasterization)."""
    import numpy as np

    from ocgis_spark.geo import geometry as G

    rng = np.random.default_rng(20260818)
    for trial in range(8):
        rings = []
        for _ in range(int(rng.integers(2, 5))):
            if rng.integers(0, 2) == 0:
                # random triangle (any orientation; may have axis-aligned
                # apexes after decomposition)
                pts = rng.uniform(0, 8, (3, 2))
                if abs(G.ring_area(np.vstack([pts, pts[:1]]))) < 0.5:
                    continue
                rings.append(np.vstack([pts, pts[:1]]))
            else:
                x0, y0 = rng.uniform(0, 6, 2)
                w, h = rng.uniform(1.0, 3.0, 2)
                rings.append(np.array(
                    [[x0, y0], [x0 + w, y0], [x0 + w, y0 + h],
                     [x0, y0 + h], [x0, y0]]))
        if len(rings) < 2:
            continue
        pieces = G.convex_union_pieces(
            [p for r in rings for p in G.polygon_convex_pieces([r])]
        )
        # (a) pairwise interior-disjoint
        for i in range(len(pieces)):
            pi = pieces[i]
            m = max(len(p) - 1 for p in pieces)
            for j in range(i + 1, len(pieces)):
                pj = pieces[j][:-1]
                pad = np.vstack([pj, np.repeat(pj[-1:], m - len(pj), 0)]) \
                    if len(pj) < m else pj
                area = G.batch_convex_clip_areas([pi], pad[None, :, :])[0]
                assert area < 1e-7, (trial, i, j, area)
        # (b) union area vs raster oracle
        total = sum(abs(G.ring_area(p)) for p in pieces)
        xs = np.linspace(-0.5, 11.5, 700)
        ys = np.linspace(-0.5, 11.5, 700)
        X, Y = np.meshgrid(xs, ys)
        inside = np.zeros(X.shape, dtype=bool)
        for r in rings:
            rr = G._orient_ccw(r)
            acc = np.zeros(X.shape, dtype=bool)
            v = rr[:-1]
            nv = len(v)
            for k in range(nv):
                x1, y1 = v[k]
                x2, y2 = v[(k + 1) % nv]
                cond = (y1 > Y) != (y2 > Y)
                with np.errstate(divide="ignore", invalid="ignore"):
                    xint = x1 + (Y - y1) * (x2 - x1) / (y2 - y1)
                acc ^= cond & (X < xint)
            inside |= acc
        cell = (xs[1] - xs[0]) * (ys[1] - ys[0])
        raster = inside.sum() * cell
        assert abs(total - raster) < max(0.05 * raster, 0.2), (
            trial, total, raster)
