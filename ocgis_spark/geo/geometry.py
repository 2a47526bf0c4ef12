"""Vectorized planar geometry predicates.

Re-implements (NumPy, batch-vectorized) the per-element Shapely math the
reference runs in Python loops:

* point-in-polygon with boundary ("touch") classification —
  reference ``GeometryProcessor.iter_intersects``
  (``src/ocgis/variable/geom.py:154-185``) and grid PIP
  (``src/ocgis/spatial/grid.py:31-100,555-724``);
* cell-box x polygon intersection (clip) area —
  reference ``grid.py:688-705`` / ``geom.py:718-764``;
* ``keep_touches`` semantics: auto True for point abstraction, False for
  polygon abstraction (``grid.py:627-631``, ``spatial_subset.py:117-121``).

Everything operates on arrays of query points / boxes against ONE polygon
(the broadcast selection geometry) — matching the reference's join shape.
"""

from __future__ import annotations

import numpy as np

EPS_AREA = 1e-12


def ring_area(ring: np.ndarray) -> float:
    """Signed shoelace area of a closed ring (positive if CCW)."""
    x, y = ring[:, 0], ring[:, 1]
    return 0.5 * float(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))


def polygon_area(rings: list[np.ndarray]) -> float:
    """Area of polygon with holes: |outer| - sum(|holes|)."""
    if not rings:
        return 0.0
    area = abs(ring_area(rings[0]))
    for hole in rings[1:]:
        area -= abs(ring_area(hole))
    return area


#: element budget for the (points × segments) broadcast kernels: the point
#: chunk is sized so each 2-D temporary stays ≈ _PIP_ELEMS·8 B (a few MB,
#: cache/TLB friendly) regardless of ring vertex count — 32 concurrent
#: Python workers on one box must not each churn hundred-MB temporaries.
_PIP_ELEMS = 400_000


def _pip_chunk(n_segments: int) -> int:
    return max(256, _PIP_ELEMS // max(n_segments, 1))


def _points_in_ring_block(
    px: np.ndarray, py: np.ndarray, ring: np.ndarray
) -> np.ndarray:
    x0, y0 = ring[:-1, 0], ring[:-1, 1]
    x1, y1 = ring[1:, 0], ring[1:, 1]
    px = px[:, None]
    py = py[:, None]
    cond = (y0 > py) != (y1 > py)
    # x coordinate of edge at scanline y; guard division on non-crossing edges
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x0 + (py - y0) * (x1 - x0) / np.where(y1 == y0, np.inf, y1 - y0)
    crossings = cond & (px < xint)
    return (crossings.sum(axis=1) % 2).astype(bool)


def close_rings(rings: list[np.ndarray]) -> list[np.ndarray]:
    """Normalize every ring to CLOSED form (first vertex repeated last).
    The spatial dispatchers call this at entry so the half-plane chains,
    boundary-segment marking, and ray casts all see the closing edge —
    user-supplied open rings silently mis-subset otherwise (r4 review)."""
    out = []
    for r in rings:
        r = np.asarray(r, dtype="f8")
        if len(r) >= 3 and not (r[0] == r[-1]).all():
            r = np.vstack([r, r[:1]])
        out.append(r)
    return out


def points_in_ring(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Vectorized even-odd ray casting: strict interior test for many points
    against one ring (boundary points are NOT guaranteed in/out — combine
    with :func:`points_on_ring` for boundary semantics). Chunked over
    points so the broadcast temporaries stay cache-sized at any ring
    vertex count.

    Closure-ROBUST: the even-odd cast needs the closing edge; an open
    ring silently misclassified every interior point while the clip
    kernels (which accept open rings) stayed correct — the mixed
    contract bit at the facade ingress (r4 review finding). Closing here
    fixes every caller at once; the vstack is selection-ring-sized."""
    ring = np.asarray(ring, dtype="f8")
    if len(ring) >= 3 and not (ring[0] == ring[-1]).all():
        ring = np.vstack([ring, ring[:1]])
    n = len(px)
    chunk = _pip_chunk(len(ring) - 1)
    if n <= chunk:
        return _points_in_ring_block(px, py, ring)
    out = np.empty(n, dtype=bool)
    for s in range(0, n, chunk):
        e = s + chunk
        out[s:e] = _points_in_ring_block(px[s:e], py[s:e], ring)
    return out


def _points_on_ring_block(
    px: np.ndarray, py: np.ndarray, ring: np.ndarray, tol: float
) -> np.ndarray:
    x0, y0 = ring[:-1, 0], ring[:-1, 1]
    x1, y1 = ring[1:, 0], ring[1:, 1]
    px2 = px[:, None]
    py2 = py[:, None]
    dx, dy = x1 - x0, y1 - y0
    seg_len2 = dx * dx + dy * dy
    seg_len2 = np.where(seg_len2 == 0, 1.0, seg_len2)
    t = ((px2 - x0) * dx + (py2 - y0) * dy) / seg_len2
    t = np.clip(t, 0.0, 1.0)
    cx = x0 + t * dx
    cy = y0 + t * dy
    d2 = (px2 - cx) ** 2 + (py2 - cy) ** 2
    return (d2 <= tol * tol).any(axis=1)


def points_on_ring(
    px: np.ndarray, py: np.ndarray, ring: np.ndarray, tol: float = 1e-12
) -> np.ndarray:
    """True where (px, py) lies on a segment of the ring (within tol).
    Chunked over points (see :func:`points_in_ring`)."""
    n = len(px)
    chunk = _pip_chunk(len(ring) - 1)
    if n <= chunk:
        return _points_on_ring_block(px, py, ring, tol)
    out = np.empty(n, dtype=bool)
    for s in range(0, n, chunk):
        e = s + chunk
        out[s:e] = _points_on_ring_block(px[s:e], py[s:e], ring, tol)
    return out


def ring_is_convex_ccw(ring: np.ndarray) -> bool:
    """True if the closed ring is convex and counter-clockwise."""
    pts = ring[:-1] if (ring[0] == ring[-1]).all() else ring
    n = len(pts)
    if n < 3:
        return False
    cross = []
    for i in range(n):
        a, b, c = pts[i], pts[(i + 1) % n], pts[(i + 2) % n]
        cross.append((b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0]))
    cross = np.array(cross)
    return bool((cross >= 0).all() and (cross > 0).any())


def points_in_convex_ccw(
    px: np.ndarray, py: np.ndarray, ring: np.ndarray, keep_touches: bool = True
) -> np.ndarray:
    """Half-plane conjunction for a convex CCW ring, with the EXACT same
    IEEE expression as :func:`ocgis_spark.fixtures.convex_pred_sql` —
    ``(x2-x1)*(py-y1) - (y2-y1)*(px-x1) >= 0`` per edge — so the Spark
    result is bit-identical to the SQL oracle."""
    out = np.ones(len(px), dtype=bool)
    for (x1, y1), (x2, y2) in zip(ring[:-1], ring[1:]):
        d = (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)
        out &= (d >= 0.0) if keep_touches else (d > 0.0)
    return out


def points_in_polygon(
    px: np.ndarray,
    py: np.ndarray,
    rings: list[np.ndarray],
    keep_touches: bool = True,
) -> np.ndarray:
    """Point-in-polygon over many points vs one polygon (outer + holes).

    ``keep_touches=True`` (reference point-abstraction default,
    ``grid.py:627-631``): boundary points count as inside.
    """
    inside = points_in_ring(px, py, rings[0])
    for hole in rings[1:]:
        inside &= ~points_in_ring(px, py, hole)
    boundary = points_on_ring(px, py, rings[0])
    for hole in rings[1:]:
        boundary |= points_on_ring(px, py, hole)
    if keep_touches:
        return inside | boundary
    return inside & ~boundary


def clip_ring_by_box(
    ring: np.ndarray, minx: float, miny: float, maxx: float, maxy: float
) -> np.ndarray:
    """Sutherland–Hodgman clip of one ring against an axis-aligned box
    (the box is convex, so S-H is exact for simple subject rings).
    Returns the clipped (possibly empty) closed ring."""
    pts = ring[:-1] if (ring[0] == ring[-1]).all() else ring

    def clip_half(pts: np.ndarray, axis: int, bound: float, keep_le: bool):
        if len(pts) == 0:
            return pts
        v = pts[:, axis]
        inside = v <= bound if keep_le else v >= bound
        nxt = np.roll(np.arange(len(pts)), -1)
        out = []
        for i in range(len(pts)):
            j = nxt[i]
            a, b = pts[i], pts[j]
            ain, bin_ = inside[i], inside[j]
            if ain:
                out.append(a)
            if ain != bin_:
                da = b[axis] - a[axis]
                t = 0.0 if da == 0 else (bound - a[axis]) / da
                out.append(a + t * (b - a))
        return np.array(out) if out else np.empty((0, 2))

    pts = clip_half(pts, 0, minx, keep_le=False)
    pts = clip_half(pts, 0, maxx, keep_le=True)
    pts = clip_half(pts, 1, miny, keep_le=False)
    pts = clip_half(pts, 1, maxy, keep_le=True)
    if len(pts) == 0:
        return np.empty((0, 2))
    return np.vstack([pts, pts[:1]])


def clip_ring_by_halfplane(
    ring: np.ndarray, a: np.ndarray, b: np.ndarray, keep_left: bool = True
) -> np.ndarray:
    """Sutherland–Hodgman clip of one ring against a single half-plane
    bounded by the directed line a→b: ``keep_left`` keeps the d >= 0 side
    of d = (bx-ax)(py-ay) - (by-ay)(px-ax) (the CCW-interior convention of
    :func:`points_in_convex_ccw`). Exact for CONVEX subject rings (a
    convex region cut by a line stays one piece); simple-but-nonconvex
    subjects can produce degenerate bridging edges, so callers gate on
    :func:`ring_is_convex_ccw`. Returns a closed ring or an empty array."""
    pts = ring[:-1] if (ring[0] == ring[-1]).all() else ring
    if len(pts) == 0:
        return np.empty((0, 2))
    d = (b[0] - a[0]) * (pts[:, 1] - a[1]) - (b[1] - a[1]) * (pts[:, 0] - a[0])
    if not keep_left:
        d = -d
    inside = d >= 0.0
    out = []
    n = len(pts)
    for i in range(n):
        j = (i + 1) % n
        if inside[i]:
            out.append(pts[i])
        if inside[i] != inside[j]:
            t = d[i] / (d[i] - d[j])
            out.append(pts[i] + t * (pts[j] - pts[i]))
    if not out:
        return np.empty((0, 2))
    arr = np.array(out)
    return np.vstack([arr, arr[:1]])


def _orient_ccw(ring: np.ndarray) -> np.ndarray:
    r = ring if (ring[0] == ring[-1]).all() else np.vstack([ring, ring[:1]])
    return r if ring_area(r) >= 0 else r[::-1].copy()


def convex_union_pieces(outers: list[np.ndarray]) -> list[np.ndarray]:
    """Decompose the union of (possibly overlapping) CONVEX rings into
    interior-DISJOINT convex pieces — the missing `get_unioned` branch for
    overlapping non-rectilinear selections (reference
    ``src/ocgis/variable/geom.py:870-1075`` unions arbitrary geometry sets
    via GEOS; here the engine's own clip kernel does it for the convex
    family without GEOS).

    Sweep: keep a running piece list; each new ring contributes only its
    part OUTSIDE every existing piece, computed by successive half-plane
    subtraction (for each edge of an existing convex piece, the fragment
    beyond that edge splits off as its own convex piece; the remainder —
    fragment ∩ piece — is already covered and is dropped). Every fragment
    stays convex, so Sutherland–Hodgman remains exact throughout. Piece
    areas therefore SUM to the union area (asserted in pytest).

    Emitted fragments are cleaned of consecutive duplicate vertices: a
    half-plane clip whose boundary passes through a subject vertex emits
    that vertex twice (once as "inside vertex", once as the crossing
    point), and a degenerate repeated corner can later fool shape
    classifiers (a triangle whose 4 stored points all sit on bbox corners
    previously passed ``_rings_is_axis_rect`` and was clipped as the full
    box — full-cell areas for cells entirely outside the piece)."""
    pieces: list[np.ndarray] = []
    for outer in outers:
        ring = _orient_ccw(np.asarray(outer, dtype="f8"))
        if not ring_is_convex_ccw(ring):
            raise ValueError("convex_union_pieces: ring is not convex")
        frags = [ring]
        for piece in list(pieces):
            nxt: list[np.ndarray] = []
            for f in frags:
                rem = f
                for k in range(len(piece) - 1):
                    if len(rem) == 0:
                        break
                    if (piece[k] == piece[k + 1]).all():
                        # zero-length edge = all-zero half-plane: every
                        # point tests "on the line" and the whole subject
                        # would split off as outside (defense-in-depth;
                        # the dedupe above should prevent these)
                        continue
                    outside = _dedupe_closed_ring(clip_ring_by_halfplane(
                        rem, piece[k], piece[k + 1], keep_left=False
                    ))
                    if len(outside) >= 4 and abs(ring_area(outside)) > EPS_AREA:
                        nxt.append(outside)
                    rem = clip_ring_by_halfplane(
                        rem, piece[k], piece[k + 1], keep_left=True
                    )
                # rem == f ∩ piece: covered by `piece`, dropped
            frags = nxt
        pieces.extend(frags)
    return pieces


def triangulate_ring(ring: np.ndarray) -> list[np.ndarray]:
    """Ear-clipping triangulation of a SIMPLE (hole-free, non-self-
    intersecting) polygon into CCW closed triangle rings whose areas sum
    to the polygon area.

    Driver-side only, on selection geometries (tens of vertices): O(n^2)
    is fine. This is the bridge that lets overlapping NON-convex
    selections dissolve through :func:`convex_union_pieces` (reference
    ``src/ocgis/variable/geom.py:870-1075`` ``get_unioned`` does this via
    GEOS ``unary_union``; here the ears feed the same half-plane
    decomposition the convex family uses)."""
    r = _orient_ccw(np.asarray(ring, dtype="f8"))
    pts = list(map(tuple, _dedupe_closed_ring(r)[:-1]))
    tris: list[np.ndarray] = []

    def _cross(a, b, c):
        return (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])

    guard = 0
    while len(pts) > 3:
        n = len(pts)
        clipped = False
        for i in range(n):
            a, b, c = pts[i - 1], pts[i], pts[(i + 1) % n]
            cr = _cross(a, b, c)
            if abs(cr) <= EPS_AREA:       # collinear: drop the vertex
                pts.pop(i)
                clipped = True
                break
            if cr < 0:                    # reflex vertex: not an ear
                continue
            # ear test: no OTHER vertex inside (or on) triangle (a, b, c)
            blocked = False
            for j in range(n):
                p = pts[j]
                if p in (a, b, c):
                    continue
                if (
                    _cross(a, b, p) >= -EPS_AREA
                    and _cross(b, c, p) >= -EPS_AREA
                    and _cross(c, a, p) >= -EPS_AREA
                ):
                    blocked = True
                    break
            # vertex containment alone is NOT sufficient: a boundary
            # chain can slice through the candidate ear with both edge
            # endpoints outside the triangle (r4 review fuzz found live
            # cases — the clipped 'ear' then overlapped the chain and
            # piece areas overcounted). The diagonal (a, c) must not
            # properly cross any non-adjacent polygon edge.
            if not blocked:
                for j in range(n):
                    u, v = pts[j], pts[(j + 1) % n]
                    if a in (u, v) or c in (u, v):
                        continue
                    d1 = _cross(a, c, u)
                    d2 = _cross(a, c, v)
                    d3 = _cross(u, v, a)
                    d4 = _cross(u, v, c)
                    if (
                        ((d1 > EPS_AREA and d2 < -EPS_AREA)
                         or (d1 < -EPS_AREA and d2 > EPS_AREA))
                        and ((d3 > EPS_AREA and d4 < -EPS_AREA)
                             or (d3 < -EPS_AREA and d4 > EPS_AREA))
                    ):
                        blocked = True
                        break
            if blocked:
                continue
            tris.append(np.array([a, b, c, a], dtype="f8"))
            pts.pop(i)
            clipped = True
            break
        guard += 1
        if not clipped or guard > 10_000:
            raise ValueError(
                "triangulate_ring: no ear found — polygon is likely "
                "self-intersecting or degenerate"
            )
    if len(pts) == 3 and abs(_cross(*pts)) > EPS_AREA:
        tris.append(np.array([*pts, pts[0]], dtype="f8"))
    # post-condition: ear areas tile the polygon exactly — a self-
    # intersecting ring (which ear clipping cannot detect locally) fails
    # this because its shoelace area cancels across the crossing
    total = sum(abs(ring_area(t)) for t in tris)
    target = abs(ring_area(r))
    if abs(total - target) > 1e-9 * max(1.0, target):
        raise ValueError(
            "triangulate_ring: ear areas do not tile the ring "
            f"({total} vs {target}) — polygon is self-intersecting"
        )
    return tris


def convex_decompose(ring: np.ndarray) -> list[np.ndarray]:
    """A simple ring as a list of interior-disjoint convex CCW pieces:
    itself when already convex, its ear-clipping triangles otherwise."""
    r = _orient_ccw(np.asarray(ring, dtype="f8"))
    if ring_is_convex_ccw(r):
        return [r]
    return triangulate_ring(r)


def trapezoid_decompose(rings: list[np.ndarray]) -> list[np.ndarray]:
    """Decompose a polygon WITH HOLES (even-odd rule over its rings) into
    interior-disjoint convex CCW trapezoids via vertical-slab sweep.

    Strictly more general than :func:`triangulate_ring`: holes and
    multiple boundary components need no bridging — every ring just
    contributes edge crossings. Slab boundaries sit at every vertex x,
    so edge order is constant within a slab interior and each even-odd
    span is one trapezoid with parallel vertical sides (always convex).
    Piece areas sum to outer − holes (checked; a mismatch means the
    input self-intersects). Driver-side on selection geometries only —
    O(V^2) pieces worst case, never corpus-sized."""
    closed = []
    for ring in rings:
        r = np.asarray(ring, dtype="f8")
        closed.append(r if (r[0] == r[-1]).all() else np.vstack([r, r[:1]]))
    edges = []
    for r in closed:
        for p, q in zip(r[:-1], r[1:]):
            if p[0] != q[0]:        # vertical edges never cross a slab mid
                edges.append((p, q))

    def y_at(p, q, x):
        # ENDPOINT-EXACT interpolation: p1 + 1.0*(q1-p1) is 1 ulp off q1
        # in float, so two edges sharing an apex vertex produced NEAR-
        # duplicate quad corners that survived the exact dedupe and broke
        # ring_is_convex_ccw's exact cross test (~37% of random simple
        # polygons; crashed the live agg_selection dissolve — r4 review)
        if x == p[0]:
            return p[1]
        if x == q[0]:
            return q[1]
        t = (x - p[0]) / (q[0] - p[0])
        return p[1] + t * (q[1] - p[1])
    if not edges:
        return []
    xs = np.unique(np.concatenate([np.asarray(r, dtype="f8")[:, 0]
                                   for r in rings]))
    pieces: list[np.ndarray] = []
    for x0, x1 in zip(xs[:-1], xs[1:]):
        if x1 - x0 <= 0:
            continue
        xm = 0.5 * (x0 + x1)
        cross = []
        for p, q in edges:
            if min(p[0], q[0]) < xm < max(p[0], q[0]):
                cross.append((
                    y_at(p, q, xm),   # sort key: y at slab mid
                    y_at(p, q, x0),   # y at x0
                    y_at(p, q, x1),   # y at x1
                ))
        if len(cross) % 2:
            raise ValueError(
                "trapezoid_decompose: odd crossing count — ring is not "
                "closed or self-intersects at a slab boundary"
            )
        cross.sort()
        for i in range(0, len(cross), 2):
            _, lo0, lo1 = cross[i]
            _, up0, up1 = cross[i + 1]
            if lo0 > up0 + 1e-12 or lo1 > up1 + 1e-12:
                raise ValueError(
                    "trapezoid_decompose: paired boundary edges cross "
                    "inside a slab — polygon is self-intersecting"
                )
            quad = np.array([
                [x0, lo0], [x1, lo1], [x1, up1], [x0, up0], [x0, lo0],
            ])
            quad = _dedupe_closed_ring(quad)
            if len(quad) >= 4 and abs(ring_area(quad)) > EPS_AREA:
                pieces.append(quad)
    total = sum(abs(ring_area(p)) for p in pieces)
    # target on CLOSED rings: an open input's shoelace/ray-cast misses
    # the closing edge and the post-condition rejected valid polygons
    # (r4 review finding)
    target = _evenodd_area(closed)
    if abs(total - target) > 1e-9 * max(1.0, target):
        raise ValueError(
            "trapezoid_decompose: piece areas do not tile the polygon "
            f"({total} vs {target}) — input is self-intersecting or a "
            "ring touches another ring's boundary"
        )
    return pieces


def _evenodd_area(rlist: list[np.ndarray]) -> float:
    """Area of the even-odd region over arbitrary non-crossing rings:
    each ring contributes |area| signed by its nesting DEPTH (+ even,
    − odd), so disjoint components add while holes (and islands inside
    holes) alternate — unlike ``polygon_area``, which assumes
    rings[1:] are all holes of rings[0]. A single boundary vertex
    stands in for the whole ring (rings may not cross, so its
    containment parity is ring-wide)."""
    total = 0.0
    for i, r in enumerate(rlist):
        depth = 0
        px = np.array([r[0, 0]])
        py = np.array([r[0, 1]])
        for j, o in enumerate(rlist):
            if j != i and bool(points_in_ring(px, py, o)[0]):
                depth += 1
        total += abs(ring_area(r)) * (1.0 if depth % 2 == 0 else -1.0)
    return total


def polygon_convex_pieces(rings: list[np.ndarray]) -> list[np.ndarray]:
    """A polygon (outer + optional holes) as interior-disjoint convex CCW
    pieces: the ring itself (convex, hole-free), its ear triangles
    (non-convex, hole-free), or its slab trapezoids (holes)."""
    if len(rings) == 1:
        return convex_decompose(rings[0])
    return trapezoid_decompose(rings)


def _dedupe_closed_ring(ring: np.ndarray) -> np.ndarray:
    """Drop consecutive duplicate vertices from a closed ring, preserving
    closure. Returns the input unchanged when already clean.

    A trailing duplicate run (e.g. a trapezoid with a left-boundary apex:
    ``[a, b, c, a, a]``) must LOSE the duplicate, not force-keep it — a
    retained zero-length edge later reads as an all-zero half-plane in
    ``convex_union_pieces`` and emits the whole subject as "outside",
    double-counting union area (r4 review finding, regression-tested)."""
    if len(ring) < 2:
        return ring
    keep = np.ones(len(ring), dtype=bool)
    keep[1:] = (ring[1:] != ring[:-1]).any(axis=1)
    if keep.all():
        return ring
    out = ring[keep]
    # pairwise dedupe can eat the closing vertex; restore closure without
    # re-introducing the zero-length edge
    if (out[-1] != out[0]).any():
        out = np.vstack([out, out[:1]])
    return out.copy()


def box_polygon_clip_area(
    rings: list[np.ndarray], minx: float, miny: float, maxx: float, maxy: float
) -> float:
    """Area of (box ∩ polygon). Holes subtract their own clipped area."""
    if not rings:
        return 0.0
    outer = clip_ring_by_box(rings[0], minx, miny, maxx, maxy)
    if len(outer) == 0:
        return 0.0
    area = abs(ring_area(outer))
    for hole in rings[1:]:
        clipped = clip_ring_by_box(hole, minx, miny, maxx, maxy)
        if len(clipped):
            area -= abs(ring_area(clipped))
    return max(area, 0.0)


def _batch_clip_halfplane(
    P: np.ndarray, cnt: np.ndarray, axis: int, bound: np.ndarray, keep_ge: bool
) -> tuple[np.ndarray, np.ndarray]:
    """One Sutherland–Hodgman half-plane pass, vectorized across N subject
    polygons (each a row of ``P`` with ``cnt`` valid open-ring vertices).
    ``bound`` is per-row (each box contributes its own edge coordinate).
    Returns the compacted (P', cnt')."""
    n, m = P.shape[0], P.shape[1]
    if m == 0:
        return P, cnt
    idx = np.arange(m)
    valid = idx[None, :] < cnt[:, None]
    v = P[:, :, axis]
    b = bound[:, None]
    inside = (v >= b) if keep_ge else (v <= b)
    inside &= valid

    # next vertex (wrap within each row's valid prefix)
    nxt = np.where(idx[None, :] + 1 < cnt[:, None], idx[None, :] + 1, 0)
    P_next = np.take_along_axis(P, nxt[:, :, None], axis=1)
    inside_next = np.take_along_axis(inside, nxt, axis=1)

    emit_v = inside  # the vertex itself
    emit_x = (inside != inside_next) & valid  # the crossing point

    da = P_next[:, :, axis] - v
    t = np.where(da == 0.0, 0.0, (b - v) / np.where(da == 0.0, 1.0, da))
    # same arithmetic as the scalar clip_half (a + t*(b-a)) — bit-parity
    inter = P + t[:, :, None] * (P_next - P)

    # interleave (vertex, crossing) per edge via contiguous block writes,
    # then compact rows (int32 cumsum: the pass is allocation-bound)
    E = np.empty((n, m, 2), dtype=bool)
    E[:, :, 0] = emit_v
    E[:, :, 1] = emit_x
    E = E.reshape(n, 2 * m)
    Q = np.empty((n, m, 2, 2), dtype="f8")
    Q[:, :, 0, :] = P
    Q[:, :, 1, :] = inter
    Q = Q.reshape(n, 2 * m, 2)

    pos = E.cumsum(axis=1, dtype=np.int32)
    new_cnt = pos[:, -1].astype("i8")
    mx = int(new_cnt.max()) if n else 0
    out = np.zeros((n, mx, 2), dtype="f8")
    rows, cols = np.nonzero(E)
    out[rows, pos[rows, cols] - 1] = Q[rows, cols]
    return out, new_cnt


def _batch_clip_halfplane_edge(
    P: np.ndarray,
    cnt: np.ndarray,
    ax: np.ndarray,
    ay: np.ndarray,
    bx: np.ndarray,
    by: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """One Sutherland–Hodgman pass against a PER-ROW arbitrary edge a→b
    (keep the left half-plane, ``cross >= 0``), vectorized across N
    subject polygons — the general-edge analogue of
    :func:`_batch_clip_halfplane` for convex mesh elements. Same keep
    predicate and ``t = sA / (sA - sB)`` interpolation as the scalar
    per-element loop it replaces (VERDICT r2 finding #2). Zero-length
    edges (padding rows of a ragged batch by repeating the last vertex)
    give ``cross == 0`` everywhere → a no-op pass, which is what makes a
    dense (N, A, 2) layout valid for mixed tri/quad meshes."""
    n, m = P.shape[0], P.shape[1]
    if m == 0:
        return P, cnt
    idx = np.arange(m)
    valid = idx[None, :] < cnt[:, None]
    ex = (bx - ax)[:, None]
    ey = (by - ay)[:, None]
    sv = ex * (P[:, :, 1] - ay[:, None]) - ey * (P[:, :, 0] - ax[:, None])
    inside = (sv >= 0.0) & valid

    nxt = np.where(idx[None, :] + 1 < cnt[:, None], idx[None, :] + 1, 0)
    P_next = np.take_along_axis(P, nxt[:, :, None], axis=1)
    inside_next = np.take_along_axis(inside, nxt, axis=1)
    sv_next = np.take_along_axis(sv, nxt, axis=1)

    emit_v = inside
    emit_x = (inside != inside_next) & valid

    denom = sv - sv_next
    t = np.where(denom == 0.0, 0.0, sv / np.where(denom == 0.0, 1.0, denom))
    inter = P + t[:, :, None] * (P_next - P)

    E = np.empty((n, m, 2), dtype=bool)
    E[:, :, 0] = emit_v
    E[:, :, 1] = emit_x
    E = E.reshape(n, 2 * m)
    Q = np.empty((n, m, 2, 2), dtype="f8")
    Q[:, :, 0, :] = P
    Q[:, :, 1, :] = inter
    Q = Q.reshape(n, 2 * m, 2)

    pos = E.cumsum(axis=1, dtype=np.int32)
    new_cnt = pos[:, -1].astype("i8")
    mx = int(new_cnt.max()) if n else 0
    out = np.zeros((n, mx, 2), dtype="f8")
    rows, cols = np.nonzero(E)
    out[rows, pos[rows, cols] - 1] = Q[rows, cols]
    return out, new_cnt


def batch_convex_clip_areas(
    sel_rings: list[np.ndarray], elem: np.ndarray
) -> np.ndarray:
    """Area of (selection ∩ element) for N CONVEX element rings at once.

    ``elem`` is a dense (N, A, 2) corner array, CCW-oriented, each row
    padded by repeating its last valid vertex (zero-length pseudo-edges
    are no-op half-plane passes). The selection polygon (outer ring +
    holes, closed or open) is the S-H subject, clipped by each element's
    A edges — A batch passes total, no per-element Python."""
    n, a = elem.shape[0], elem.shape[1]

    def clip_all(subject: np.ndarray) -> np.ndarray:
        pts = subject[:-1] if (subject[0] == subject[-1]).all() else subject
        P = np.broadcast_to(pts[None, :, :], (n, len(pts), 2))
        c = np.full(n, len(pts), dtype="i8")
        for k in range(a):
            k2 = (k + 1) % a
            P, c = _batch_clip_halfplane_edge(
                P, c,
                elem[:, k, 0], elem[:, k, 1],
                elem[:, k2, 0], elem[:, k2, 1],
            )
        return _batch_ragged_area(P, c)

    area = clip_all(sel_rings[0])
    for hole in sel_rings[1:]:
        area -= clip_all(hole)
    return np.maximum(area, 0.0)


def _batch_ragged_area(P: np.ndarray, cnt: np.ndarray) -> np.ndarray:
    """|shoelace| over rows of open rings with ragged valid counts."""
    n, m = P.shape[0], P.shape[1]
    if m == 0:
        return np.zeros(n, dtype="f8")
    idx = np.arange(m)
    valid = idx[None, :] < cnt[:, None]
    nxt = np.where(idx[None, :] + 1 < cnt[:, None], idx[None, :] + 1, 0)
    x, y = P[:, :, 0], P[:, :, 1]
    xn = np.take_along_axis(x, nxt, axis=1)
    yn = np.take_along_axis(y, nxt, axis=1)
    contrib = np.where(valid, x * yn - xn * y, 0.0)
    area = 0.5 * np.abs(contrib.sum(axis=1))
    area[cnt < 3] = 0.0
    return area


def batch_ring_clip_areas(
    ring: np.ndarray,
    minx: np.ndarray,
    miny: np.ndarray,
    maxx: np.ndarray,
    maxy: np.ndarray,
) -> np.ndarray:
    """Area of (box ∩ ring) for MANY boxes against one ring — fully
    vectorized Sutherland–Hodgman (every half-plane pass operates on the
    whole box batch at once; no per-candidate Python loop, VERDICT r1
    finding #3). Matches :func:`clip_ring_by_box` +
    :func:`ring_area` bit-for-bit (same arithmetic, batch layout)."""
    pts = np.ascontiguousarray(ring[:-1] if (ring[0] == ring[-1]).all() else ring)
    n = len(minx)
    # read-only broadcast view — the first pass never writes into P
    P = np.broadcast_to(pts[None, :, :], (n, len(pts), 2))
    cnt = np.full(n, len(pts), dtype="i8")
    P, cnt = _batch_clip_halfplane(P, cnt, 0, np.asarray(minx, "f8"), keep_ge=True)
    P, cnt = _batch_clip_halfplane(P, cnt, 0, np.asarray(maxx, "f8"), keep_ge=False)
    P, cnt = _batch_clip_halfplane(P, cnt, 1, np.asarray(miny, "f8"), keep_ge=True)
    P, cnt = _batch_clip_halfplane(P, cnt, 1, np.asarray(maxy, "f8"), keep_ge=False)
    return _batch_ragged_area(P, cnt)


def _boxes_near_ring(
    ring: np.ndarray,
    minx: np.ndarray,
    miny: np.ndarray,
    maxx: np.ndarray,
    maxy: np.ndarray,
) -> np.ndarray:
    """True where any ring edge's bbox overlaps the box (conservative
    boundary-cell detector). Chunked so the N×V mask stays bounded."""
    pts = ring[:-1] if (ring[0] == ring[-1]).all() else ring
    x0, y0 = pts[:, 0], pts[:, 1]
    x1, y1 = np.roll(x0, -1), np.roll(y0, -1)
    elx, ehx = np.minimum(x0, x1), np.maximum(x0, x1)
    ely, ehy = np.minimum(y0, y1), np.maximum(y0, y1)
    n, v = len(minx), len(pts)
    out = np.zeros(n, dtype=bool)
    # fixed element budget per CLAUDE.md: 32 concurrent Python workers
    # each allocating |boxes|x|segments| temporaries thrash the box
    step = max(1, _PIP_ELEMS // max(v, 1))
    for s in range(0, n, step):
        e = min(s + step, n)
        hit = (
            (elx[None, :] <= maxx[s:e, None]) & (ehx[None, :] >= minx[s:e, None])
            & (ely[None, :] <= maxy[s:e, None]) & (ehy[None, :] >= miny[s:e, None])
        )
        out[s:e] = hit.any(axis=1)
    return out


def batch_box_polygon_clip_areas(
    rings: list[np.ndarray],
    minx: np.ndarray,
    miny: np.ndarray,
    maxx: np.ndarray,
    maxy: np.ndarray,
) -> np.ndarray:
    """Batch form of :func:`box_polygon_clip_area` for many boxes at once.

    Two-tier: boxes touching no ring edge are entirely inside or outside
    every ring (rings are closed), so one vectorized center-PIP decides
    box-area-or-zero; only *boundary* boxes — O(perimeter/res), typically a
    few % of a fine grid — run the vectorized Sutherland–Hodgman. This is
    what makes a continental polygon over a fine grid tractable
    (VERDICT r1 finding #3): interior cells never touch the clip kernel."""
    minx = np.asarray(minx, "f8")
    miny = np.asarray(miny, "f8")
    maxx = np.asarray(maxx, "f8")
    maxy = np.asarray(maxy, "f8")
    n = len(minx)
    areas = np.zeros(n, dtype="f8")
    near = np.zeros(n, dtype=bool)
    for ring in rings:
        near |= _boxes_near_ring(ring, minx, miny, maxx, maxy)
    # far boxes can't touch any ring boundary — the cheap strict ray-cast
    # suffices (no points_on_ring distance pass), after a bbox reject
    outer = rings[0]
    pminx, pminy = outer[:, 0].min(), outer[:, 1].min()
    pmaxx, pmaxy = outer[:, 0].max(), outer[:, 1].max()
    far = (
        ~near
        & (minx <= pmaxx) & (maxx >= pminx) & (miny <= pmaxy) & (maxy >= pminy)
    )
    if far.any():
        cx = (minx[far] + maxx[far]) * 0.5
        cy = (miny[far] + maxy[far]) * 0.5
        inside = points_in_ring(cx, cy, rings[0])
        for hole in rings[1:]:
            inside &= ~points_in_ring(cx, cy, hole)
        areas[far] = np.where(
            inside, (maxx[far] - minx[far]) * (maxy[far] - miny[far]), 0.0
        )
    if near.any():
        idx = np.nonzero(near)[0]
        a = batch_ring_clip_areas(rings[0], minx[idx], miny[idx], maxx[idx], maxy[idx])
        for hole in rings[1:]:
            a = a - batch_ring_clip_areas(hole, minx[idx], miny[idx], maxx[idx], maxy[idx])
        areas[idx] = np.maximum(a, 0.0)
    return areas


def boxes_intersect_polygon(
    minx: np.ndarray,
    miny: np.ndarray,
    maxx: np.ndarray,
    maxy: np.ndarray,
    rings: list[np.ndarray],
    keep_touches: bool = False,
) -> tuple[np.ndarray, np.ndarray]:
    """For arrays of boxes vs one polygon return ``(keep_mask, clip_area)``.

    Fast paths: (a) bbox reject, (b) axis-aligned-rectangle polygon →
    closed-form overlap area (fully vectorized, no per-box loop). The general
    path runs Sutherland–Hodgman per *candidate* box only — candidates have
    already been thinned by the coarse cell join (SURVEY.md §2.3 phase 1).

    ``keep_touches=False`` (polygon abstraction, ``grid.py:627-631``): a box
    sharing only an edge/corner with the polygon (clip area == 0) is dropped.
    ``keep_touches=True``: boundary contact keeps the box.
    """
    n = len(minx)
    areas = np.zeros(n, dtype="f8")
    outer = rings[0]
    pminx, pminy = outer[:, 0].min(), outer[:, 1].min()
    pmaxx, pmaxy = outer[:, 0].max(), outer[:, 1].max()

    touch_ok = (minx <= pmaxx) & (maxx >= pminx) & (miny <= pmaxy) & (maxy >= pminy)

    is_rect = _rings_is_axis_rect(rings)
    if is_rect:
        ox = np.minimum(maxx, pmaxx) - np.maximum(minx, pminx)
        oy = np.minimum(maxy, pmaxy) - np.maximum(miny, pminy)
        areas = np.maximum(ox, 0.0) * np.maximum(oy, 0.0)
        areas[~touch_ok] = 0.0
    else:
        cand = np.nonzero(touch_ok)[0]
        if len(cand):
            areas[cand] = batch_box_polygon_clip_areas(
                rings,
                np.asarray(minx, "f8")[cand], np.asarray(miny, "f8")[cand],
                np.asarray(maxx, "f8")[cand], np.asarray(maxy, "f8")[cand],
            )
    if keep_touches:
        keep = touch_ok & ((areas > EPS_AREA) | _boxes_touch_polygon(
            minx, miny, maxx, maxy, rings, touch_ok, areas
        ))
    else:
        keep = areas > EPS_AREA
    return keep, areas


def split_polygon_by_boxes(
    rings: list[np.ndarray],
    boxes: list[tuple[float, float, float, float]],
) -> list[tuple[int, list[np.ndarray]]]:
    """Split one polygon into per-box pieces (Sutherland–Hodgman against
    each box) — the reference's grid-splitter semantics for chunked
    processing (``grid_chunker.py``: per-tile source geometry). Returns
    ``[(box_index, piece_rings), ...]``; empty intersections omitted; holes
    clipped alongside and kept only when non-degenerate."""
    out = []
    for i, (minx, miny, maxx, maxy) in enumerate(boxes):
        piece = clip_ring_by_box(rings[0], minx, miny, maxx, maxy)
        if len(piece) < 4 or abs(ring_area(piece)) <= EPS_AREA:
            continue
        piece_rings = [piece]
        for hole in rings[1:]:
            h = clip_ring_by_box(hole, minx, miny, maxx, maxy)
            if len(h) >= 4 and abs(ring_area(h)) > EPS_AREA:
                piece_rings.append(h)
        out.append((i, piece_rings))
    return out


def _rings_is_axis_rect(rings: list[np.ndarray]) -> bool:
    if len(rings) != 1:
        return False
    r = rings[0]
    pts = r[:-1] if (r[0] == r[-1]).all() else r
    if len(pts) != 4:
        return False
    xs, ys = np.unique(pts[:, 0]), np.unique(pts[:, 1])
    if len(xs) != 2 or len(ys) != 2:
        return False
    # the 4 points must be the 4 DISTINCT corners — a triangle with a
    # duplicated corner vertex also has 4 stored points all on bbox
    # corners and must NOT take the closed-form full-box path
    return len(np.unique(pts, axis=0)) == 4


def _boxes_touch_polygon(minx, miny, maxx, maxy, rings, touch_ok, areas):
    """Boundary-contact test for zero-area candidates: any polygon vertex on
    the box border, or any box corner on/inside the polygon."""
    n = len(minx)
    out = np.zeros(n, dtype=bool)
    verts = rings[0]
    idx = np.nonzero(touch_ok & (areas <= EPS_AREA))[0]
    for i in idx:
        vx, vy = verts[:, 0], verts[:, 1]
        # absolute 1e-12 tolerance: np.isclose's default rtol=1e-5 has
        # ~1e-3-degree slack at lon-scale magnitudes and kept boxes
        # ~30 m away from the polygon in keep_touches subsets (r4 review)
        on_border = (
            ((np.isclose(vx, minx[i], rtol=0.0, atol=1e-12)
              | np.isclose(vx, maxx[i], rtol=0.0, atol=1e-12))
             & (vy >= miny[i]) & (vy <= maxy[i]))
            | ((np.isclose(vy, miny[i], rtol=0.0, atol=1e-12)
                | np.isclose(vy, maxy[i], rtol=0.0, atol=1e-12))
               & (vx >= minx[i]) & (vx <= maxx[i]))
        )
        if on_border.any():
            out[i] = True
            continue
        cx = np.array([minx[i], maxx[i], maxx[i], minx[i]])
        cy = np.array([miny[i], miny[i], maxy[i], maxy[i]])
        hit = points_in_polygon(cx, cy, rings, keep_touches=True)
        out[i] = bool(hit.any())
    return out


def _segments_intersect(a0, a1, b0, b1) -> np.ndarray:
    """Pairwise proper/improper segment intersection between two segment
    sets: a0/a1 (n,2) and b0/b1 (m,2) -> (n, m) bool. Standard
    orientation test (cross-product signs) incl. collinear-overlap via
    bbox checks — exact enough for a driver-side selection-geometry
    overlap decision (selection sets are small; O(n·m) broadcast)."""
    def cross(o, d, p):
        # (d - o) x (p - o) for every (seg, point) pair
        return ((d[:, None, 0] - o[:, None, 0]) * (p[None, :, 1] - o[:, None, 1])
                - (d[:, None, 1] - o[:, None, 1]) * (p[None, :, 0] - o[:, None, 0]))

    d1 = cross(a0, a1, b0)       # (n, m): b0 vs line(a)
    d2 = cross(a0, a1, b1)       # (n, m)
    d3t = cross(b0, b1, a0)      # (m, n): a0 vs line(b)
    d4t = cross(b0, b1, a1)      # (m, n)
    proper = ((d1 * d2) < 0) & ((d3t.T * d4t.T) < 0)

    # collinear/touching: an ENDPOINT with zero cross lying within the
    # other segment's bbox
    def on(dv, p0, p1, q):
        # dv: (len(p), len(q)) cross of q against segments (p0, p1)
        near = dv == 0.0
        inx = (
            (q[None, :, 0] >= np.minimum(p0[:, None, 0], p1[:, None, 0]))
            & (q[None, :, 0] <= np.maximum(p0[:, None, 0], p1[:, None, 0]))
            & (q[None, :, 1] >= np.minimum(p0[:, None, 1], p1[:, None, 1]))
            & (q[None, :, 1] <= np.maximum(p0[:, None, 1], p1[:, None, 1]))
        )
        return near & inx

    touch = (
        on(d1, a0, a1, b0) | on(d2, a0, a1, b1)
        | on(d3t, b0, b1, a0).T | on(d4t, b0, b1, a1).T
    )
    return proper | touch


def rings_overlap(rings_a: list[np.ndarray], rings_b: list[np.ndarray]) -> bool:
    """Exact 'do two polygons overlap (share interior or boundary)' test
    on their OUTER rings — the driver-side disjointness gate for
    agg_selection dissolve over arbitrary (non-rectilinear) selections
    (reference get_unioned unions any geometry set, geom.py:870-1075;
    two selections whose outers are disjoint union trivially). Holes are
    ignored: treating holed polygons as filled is conservative (may call
    overlap where interiors are disjoint), which only narrows what we
    accept — never wrong output."""
    A, B = np.asarray(rings_a[0], float), np.asarray(rings_b[0], float)
    # bbox reject
    if (A[:, 0].max() < B[:, 0].min() or B[:, 0].max() < A[:, 0].min()
            or A[:, 1].max() < B[:, 1].min() or B[:, 1].max() < A[:, 1].min()):
        return False
    # vertex containment either way
    if points_in_ring(B[:, 0], B[:, 1], A).any():
        return True
    if points_in_ring(A[:, 0], A[:, 1], B).any():
        return True
    # any edge crossing (covers identical/edge-touching polygons)
    a0, a1 = A, np.roll(A, -1, axis=0)
    b0, b1 = B, np.roll(B, -1, axis=0)
    return bool(_segments_intersect(a0, a1, b0, b1).any())
