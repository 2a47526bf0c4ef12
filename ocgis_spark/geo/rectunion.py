"""Rectilinear polygon union (no GEOS): union of axis-aligned boxes that
share exact edge coordinates — same-grid cells, possibly clamped by one
clip rectangle.

This supplies the reference's union GEOMETRY output, which round 1 only
emitted as an area: ``get_unioned`` returns the dissolved geometry
(``src/ocgis/variable/geom.py:870-1075``), and ``agg_selection`` unions
the selection geometries (``ops/parms/definition.py:74``).

Algorithm (edge cancellation + left-turn tracing):

1. every box contributes its 4 directed CCW edges; an edge and its exact
   reverse (shared interior edge between two boxes) cancel;
2. surviving edges are the union boundary; chain them by walking from each
   unused edge, at junction vertices (checkerboard corners) taking the
   most counter-clockwise turn — this keeps corner-touching regions as
   separate rings;
3. collinear runs merge; rings are canonicalized (start at the
   lexicographically smallest vertex) and sorted — output is fully
   deterministic;
4. CCW rings (positive shoelace) are outers, CW rings are holes; holes are
   attached to the outer that contains them.

Precondition: boxes are interior-disjoint and adjacent boxes share FULL
edges (true for cells of one grid clipped by one rectangle). Documented in
FIDELITY.md; arbitrary box soups would need edge splitting first.
"""

from __future__ import annotations

import numpy as np

from . import geometry as G
from . import wkb as WKB


def _box_edges(minx, miny, maxx, maxy):
    a = (minx, miny)
    b = (maxx, miny)
    c = (maxx, maxy)
    d = (minx, maxy)
    return [(a, b), (b, c), (c, d), (d, a)]


def boundary_edges(
    minx: np.ndarray, miny: np.ndarray, maxx: np.ndarray, maxy: np.ndarray
) -> list[tuple[tuple[float, float], tuple[float, float]]]:
    """Directed boundary edges after interior cancellation."""
    edges: set = set()
    for i in range(len(minx)):
        if maxx[i] <= minx[i] or maxy[i] <= miny[i]:
            continue  # degenerate (zero-area clip slivers)
        for e in _box_edges(float(minx[i]), float(miny[i]),
                            float(maxx[i]), float(maxy[i])):
            rev = (e[1], e[0])
            if rev in edges:
                edges.remove(rev)
            else:
                edges.add(e)
    return sorted(edges)


_DIRS = {(1, 0): 0.0, (0, 1): 90.0, (-1, 0): 180.0, (0, -1): 270.0}


def _direction(a, b) -> float:
    dx, dy = b[0] - a[0], b[1] - a[1]
    return _DIRS[(int(np.sign(dx)), int(np.sign(dy)))]


def trace_rings(edges) -> list[np.ndarray]:
    """Chain directed edges into closed rings (left-turn rule at
    junctions); merge collinear runs; canonicalize start + order."""
    out_map: dict = {}
    for e in edges:
        out_map.setdefault(e[0], []).append(e[1])
    for v in out_map:
        out_map[v].sort()
    rings = []
    unused = set(edges)
    for start_edge in edges:
        if start_edge not in unused:
            continue
        ring = [start_edge[0], start_edge[1]]
        unused.discard(start_edge)
        cur, prev = start_edge[1], start_edge[0]
        while cur != ring[0]:
            cands = [b for b in out_map.get(cur, []) if (cur, b) in unused]
            if not cands:
                raise ValueError("open boundary chain (inputs violate the "
                                 "shared-full-edge precondition)")
            # most counter-clockwise turn relative to the incoming direction
            din = _direction(prev, cur)
            best = min(
                cands,
                key=lambda b: ((_direction(cur, b) - din - 1e-9) % 360.0),
            )
            unused.discard((cur, best))
            ring.append(best)
            prev, cur = cur, best
        # drop the duplicated closing vertex for processing
        ring = ring[:-1]
        # PINCH SPLIT: a cycle that visits a vertex twice (two holes or
        # two regions touching at a corner the turn rule routed through)
        # is a figure-eight — OGC-invalid as one ring. Split at repeated
        # vertices into simple loops (areas/orientation preserved; the
        # loops still touch at the pinch point, which IS valid). r4
        # review: corner-touching HOLES previously merged into one
        # self-intersecting ring.
        loops = [ring]
        i = 0
        while i < len(loops):
            rg = loops[i]
            seen: dict = {}
            split = None
            for j, v in enumerate(rg):
                if v in seen:
                    split = (seen[v], j)
                    break
                seen[v] = j
            if split is None:
                i += 1
                continue
            a, b = split
            loops[i] = rg[a:b]
            loops.append(rg[:a] + rg[b:])
        for ring in loops:
            # merge collinear runs
            merged = []
            n = len(ring)
            for i2 in range(n):
                p0, p1, p2 = ring[i2 - 1], ring[i2], ring[(i2 + 1) % n]
                if _direction(p0, p1) != _direction(p1, p2):
                    merged.append(p1)
            if len(merged) < 3:
                continue
            # canonical start: lexicographically smallest vertex
            k = merged.index(min(merged))
            merged = merged[k:] + merged[:k]
            merged.append(merged[0])
            rings.append(np.array(merged, dtype="f8"))
    rings.sort(key=lambda r: (r[0, 0], r[0, 1], -abs(G.ring_area(r))))
    return rings


def union_boxes(
    minx: np.ndarray, miny: np.ndarray, maxx: np.ndarray, maxy: np.ndarray
) -> list[list[np.ndarray]]:
    """Union of boxes → list of polygons ``[outer, holes...]``."""
    rings = trace_rings(boundary_edges(
        np.asarray(minx, "f8"), np.asarray(miny, "f8"),
        np.asarray(maxx, "f8"), np.asarray(maxy, "f8"),
    ))
    outers = [r for r in rings if G.ring_area(r) > 0]
    holes = [r for r in rings if G.ring_area(r) < 0]
    polys = [[o] for o in outers]
    for h in holes:
        px, py = np.array([h[0, 0]]), np.array([h[0, 1]])
        for poly in polys:
            if G.points_in_polygon(px, py, [poly[0]], keep_touches=True)[0]:
                poly.append(h)
                break
        else:
            raise ValueError("hole ring not contained in any outer")
    return polys


def disjointify_boxes(
    minx: np.ndarray, miny: np.ndarray, maxx: np.ndarray, maxy: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Decompose possibly-OVERLAPPING boxes into disjoint sub-boxes on the
    grid induced by all box edges (covered = sub-cell center inside any
    input box). :func:`union_boxes`'s edge cancellation assumes a disjoint
    partition (grid cells); overlapping selection rectangles must pass
    through here first or interior edges fail to cancel and the dissolve
    double-counts the overlap."""
    minx, miny = np.asarray(minx, "f8"), np.asarray(miny, "f8")
    maxx, maxy = np.asarray(maxx, "f8"), np.asarray(maxy, "f8")
    xs = np.unique(np.concatenate([minx, maxx]))
    ys = np.unique(np.concatenate([miny, maxy]))
    X0, Y0 = np.meshgrid(xs[:-1], ys[:-1])
    X1, Y1 = np.meshgrid(xs[1:], ys[1:])
    X0, Y0, X1, Y1 = X0.ravel(), Y0.ravel(), X1.ravel(), Y1.ravel()
    cx, cy = (X0 + X1) / 2.0, (Y0 + Y1) / 2.0
    cov = np.zeros(len(X0), dtype=bool)
    for i in range(len(minx)):
        cov |= (
            (cx >= minx[i]) & (cx <= maxx[i])
            & (cy >= miny[i]) & (cy <= maxy[i])
        )
    return X0[cov], Y0[cov], X1[cov], Y1[cov]


def union_wkb(minx, miny, maxx, maxy) -> bytes:
    """Union of boxes as WKB (Polygon if single outer, else MultiPolygon)."""
    polys = union_boxes(minx, miny, maxx, maxy)
    if len(polys) == 1:
        return WKB.polygon_to_wkb(polys[0])
    return WKB.multipolygon_to_wkb(polys)


def union_area(polys: list[list[np.ndarray]]) -> float:
    return float(sum(G.polygon_area(p) for p in polys))
