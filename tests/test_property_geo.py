"""Property-based tests (hypothesis) for the geometry kernel — invariants
the reference never tested (SURVEY §5 notes it has no randomized testing)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from ocgis_spark.geo import geometry as G
from ocgis_spark.geo import wkb
from ocgis_spark.geo.cellindex import GridSpec, covering_cells, zdecode, zencode

coord = st.floats(-180.0, 180.0, allow_nan=False, width=64)
cell_idx = st.integers(0, 2**31 - 1)


@given(st.lists(st.tuples(cell_idx, cell_idx), min_size=1, max_size=50))
def test_zorder_roundtrip_property(pairs):
    cy = np.array([p[0] for p in pairs], dtype="i8")
    cx = np.array([p[1] for p in pairs], dtype="i8")
    dy, dx = zdecode(zencode(cy, cx))
    assert (dy == cy).all() and (dx == cx).all()


@given(st.tuples(coord, coord, coord, coord))
def test_wkb_box_roundtrip_property(t):
    x1, y1, x2, y2 = t
    minx, maxx = sorted((x1, x2))
    miny, maxy = sorted((y1, y2))
    buf = wkb.box_to_wkb(minx, miny, maxx, maxy)
    assert wkb.wkb_bounds(buf) == (minx, miny, maxx, maxy)


def _rand_convex(rng):
    """Random convex CCW polygon via sorted angles on a circle."""
    n = rng.integers(3, 9)
    ang = np.sort(rng.uniform(0, 2 * np.pi, n))
    r = rng.uniform(0.5, 3.0)
    cx, cy = rng.uniform(-5, 5, 2)
    pts = np.stack([cx + r * np.cos(ang), cy + r * np.sin(ang)], axis=1)
    return np.vstack([pts, pts[:1]])


@given(st.integers(0, 10_000))
@settings(max_examples=30, deadline=None)
def test_convex_halfplane_matches_raycast(seed):
    """The convex half-plane fast path and the general even-odd ray cast
    must agree on strictly interior/exterior points."""
    rng = np.random.default_rng(seed)
    ring = _rand_convex(rng)
    px = rng.uniform(-7, 7, 200)
    py = rng.uniform(-7, 7, 200)
    a = G.points_in_convex_ccw(px, py, ring, keep_touches=True)
    b = G.points_in_polygon(px, py, [ring], keep_touches=True)
    # exclude near-boundary points (the two algorithms may legitimately
    # disagree within FP noise of an edge)
    d = np.abs(
        np.min(
            [
                (ring[i + 1, 0] - ring[i, 0]) * (py - ring[i, 1])
                - (ring[i + 1, 1] - ring[i, 1]) * (px - ring[i, 0])
                for i in range(len(ring) - 1)
            ],
            axis=0,
        )
    )
    clear = d > 1e-9
    assert (a[clear] == b[clear]).all()


@given(st.integers(0, 10_000))
@settings(max_examples=30, deadline=None)
def test_clip_area_bounded_and_consistent(seed):
    """box∩polygon area is within [0, min(box area, polygon area)] and a
    box fully inside the polygon clips to exactly the box area."""
    rng = np.random.default_rng(seed)
    ring = _rand_convex(rng)
    poly_area = abs(G.ring_area(ring))
    bx = rng.uniform(-6, 6)
    by = rng.uniform(-6, 6)
    w, h = rng.uniform(0.1, 2.0, 2)
    a = G.box_polygon_clip_area([ring], bx, by, bx + w, by + h)
    assert -1e-12 <= a <= min(w * h, poly_area) + 1e-9
    # a box whose 4 corners are strictly inside clips to exactly its area
    # (for THIN polygons the vertex centroid can sit near an edge and the
    # box pokes out — hypothesis found that case, so gate on the corners)
    cx, cy = ring[:-1, 0].mean(), ring[:-1, 1].mean()
    eps = 0.01
    corners_x = np.array([cx - eps, cx + eps, cx + eps, cx - eps])
    corners_y = np.array([cy - eps, cy - eps, cy + eps, cy + eps])
    if G.points_in_polygon(corners_x, corners_y, [ring], keep_touches=False).all():
        inside = G.box_polygon_clip_area([ring], cx - eps, cy - eps,
                                         cx + eps, cy + eps)
        assert inside == pytest_approx(4 * eps * eps)


def pytest_approx(x, rel=1e-9):
    import pytest

    return pytest.approx(x, rel=rel)


@given(st.integers(0, 10_000))
@settings(max_examples=20, deadline=None)
def test_covering_is_superset_of_member_cells(seed):
    """Every grid cell whose box intersects the polygon is in the covering
    (no false negatives — phase 1 must never drop a true candidate)."""
    rng = np.random.default_rng(seed)
    spec = GridSpec(lon0=-6.0, lat0=-6.0, res=0.5, nx=24, ny=24)
    ring = _rand_convex(rng)
    cov = set(covering_cells(spec, [ring]).tolist())
    yy, xx = np.meshgrid(np.arange(spec.ny), np.arange(spec.nx), indexing="ij")
    cy, cx = yy.ravel(), xx.ravel()
    minx, miny, maxx, maxy = spec.bounds(cy, cx)
    keep, _ = G.boxes_intersect_polygon(minx, miny, maxx, maxy, [ring],
                                        keep_touches=True)
    member = set(zencode(cy[keep], cx[keep]).tolist())
    assert member <= cov


@given(st.integers(min_value=0, max_value=10_000))
@settings(max_examples=40, deadline=None)
def test_batch_clip_matches_scalar_property(seed):
    """Property: the two-tier batch kernel equals the scalar kernel for
    random star-shaped polygons and random box batches."""
    rng = np.random.RandomState(seed)
    V = rng.randint(4, 24)
    ang = np.sort(rng.uniform(0, 2 * np.pi, V))
    # drop near-duplicate angles (degenerate edges)
    keep = np.concatenate([[True], np.diff(ang) > 1e-3])
    ang = ang[keep]
    if len(ang) < 3:
        return
    rad = rng.uniform(0.3, 3.0, len(ang))
    ring = np.c_[rad * np.cos(ang), rad * np.sin(ang)]
    ring = np.vstack([ring, ring[:1]])
    n = 64
    minx = rng.uniform(-3.5, 3.0, n)
    miny = rng.uniform(-3.5, 3.0, n)
    maxx = minx + rng.uniform(0.05, 2.0, n)
    maxy = miny + rng.uniform(0.05, 2.0, n)
    batch = G.batch_box_polygon_clip_areas([ring], minx, miny, maxx, maxy)
    scalar = np.array([
        G.box_polygon_clip_area([ring], minx[i], miny[i], maxx[i], maxy[i])
        for i in range(n)
    ])
    assert np.allclose(batch, scalar, rtol=1e-10, atol=1e-12)


def _rand_star(rng):
    """Random star (generally NON-convex) CCW polygon: sorted angles,
    per-vertex random radii."""
    n = rng.integers(5, 14)
    ang = np.sort(rng.uniform(0, 2 * np.pi, n))
    r = rng.uniform(0.3, 3.0, n)
    cx, cy = rng.uniform(-4, 4, 2)
    pts = np.stack([cx + r * np.cos(ang), cy + r * np.sin(ang)], axis=1)
    return np.vstack([pts, pts[:1]])


@given(st.integers(0, 10_000))
@settings(max_examples=30, deadline=None)
def test_covering_z_ranges_property(seed):
    """Adaptive Z-range covering vs the flat covering on random star
    polygons and random grids: EQUAL at unlimited budget, superset with
    sorted/disjoint intervals at any budget (r4s10)."""
    from ocgis_spark.geo.cellindex import covering_z_ranges

    rng = np.random.default_rng(seed)
    n = int(rng.integers(8, 96))
    spec = GridSpec(
        lon0=float(rng.uniform(-8, -6)), lat0=float(rng.uniform(-8, -6)),
        res=12.0 / n, nx=n, ny=n,
    )
    ring = _rand_star(rng)
    flat = set(covering_cells(spec, [ring]).tolist())

    exact = covering_z_ranges(spec, [ring], max_cells=10**9)
    keys = set()
    for lo, hi in exact:
        keys.update(range(lo, hi + 1))
    cy, cx = zdecode(np.array(sorted(keys), dtype="i8"))
    valid = {
        int(k) for k, y, x in zip(sorted(keys), cy, cx)
        if y < spec.ny and x < spec.nx
    }
    assert valid == flat

    budget = int(rng.integers(4, 64))
    coarse = covering_z_ranges(spec, [ring], max_cells=budget)
    for (l1, h1), (l2, h2) in zip(coarse, coarse[1:]):
        assert l1 <= h1 and h1 + 1 < l2
    ckeys = set()
    for lo, hi in coarse:
        ckeys.update(range(lo, hi + 1))
    assert flat <= ckeys
