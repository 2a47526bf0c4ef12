"""Z-order (Morton) spatial cell index — the engine's H3/S2 analogue.

The container ships no h3/s2 bindings, so the distributed spatial index the
north rule requires is a deterministic Z-order curve over a configurable
lon/lat grid. It plays the exact role H3 plays in the design (SURVEY.md
§2.3): a coarse cell id computed per row (vectorized), a driver-side
*covering* (cell set) of a broadcast query polygon, and ring expansion for
kNN candidate generation. Replaces the reference's per-process R-tree
(``src/ocgis/spatial/index.py:5-87``) with a shuffle-friendly key.

Bit interleaving gives spatial locality: nearby cells share id prefixes, so
``repartitionByRange(zcell)`` co-locates spatial neighborhoods and a
cell-prefix is a natural salting unit for hot (dense) regions.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from . import geometry as G


@dataclass(frozen=True)
class GridSpec:
    """A rectilinear CF grid (ocgis ``Grid``, ``src/ocgis/spatial/grid.py:181``)
    in factorized form: origin + resolution + shape. Cell (y, x) centroid is
    ``(lat0 + (y + .5) * res, lon0 + (x + .5) * res)``; bounds are ±res/2.

    The golden instance mirrors the reference's ``make_test_data`` fixture
    (``test/test_simple/make_test_data.py:35-120``): 4x4 cells, 1° res,
    centroid lons -105..-102, lats 37..40 → extent [-105.5, -101.5] x
    [36.5, 40.5].
    """

    lon0: float = -105.5  # west edge
    lat0: float = 36.5  # south edge
    res: float = 1.0
    nx: int = 4
    ny: int = 4

    @property
    def lon1(self) -> float:
        return self.lon0 + self.nx * self.res

    @property
    def lat1(self) -> float:
        return self.lat0 + self.ny * self.res

    def scaled(self, n: int) -> "GridSpec":
        """Same extent, n x n cells (FIXTURES.md §2 scaled instances)."""
        return GridSpec(
            self.lon0, self.lat0, (self.lon1 - self.lon0) / n, n, n
        )

    def cell_of(self, lon: np.ndarray, lat: np.ndarray):
        cx = np.floor((np.asarray(lon) - self.lon0) / self.res).astype("i8")
        cy = np.floor((np.asarray(lat) - self.lat0) / self.res).astype("i8")
        return cy, cx

    def centroid(self, cy, cx):
        lon = self.lon0 + (np.asarray(cx) + 0.5) * self.res
        lat = self.lat0 + (np.asarray(cy) + 0.5) * self.res
        return lat, lon

    def bounds(self, cy, cx):
        lat_c, lon_c = self.centroid(cy, cx)
        h = self.res / 2.0
        return lon_c - h, lat_c - h, lon_c + h, lat_c + h


@dataclass(frozen=True)
class VectorGridSpec:
    """A NON-UNIFORM rectilinear grid from coordinate *edge* vectors — the
    reference ``Grid`` built from arbitrary coordinate variables with bounds
    (``src/ocgis/spatial/grid.py:350-362``; 1-D→2-D expansion
    ``grid.py:1287-1348``). Real CF data (Gaussian grids, stretched ocean
    grids) violates :class:`GridSpec`'s constant-resolution assumption;
    this spec carries the ascending edge arrays instead.

    ``x_edges`` has nx+1 entries, ``y_edges`` ny+1; cell (y, x) spans
    ``[x_edges[x], x_edges[x+1]) × [y_edges[y], y_edges[y+1])`` (half-open,
    matching the uniform grid's floor assignment)."""

    x_edges: tuple[float, ...]
    y_edges: tuple[float, ...]

    @classmethod
    def from_edges(cls, x_edges, y_edges) -> "VectorGridSpec":
        return cls(
            tuple(float(v) for v in x_edges), tuple(float(v) for v in y_edges)
        )

    @classmethod
    def from_centroids(cls, x_centers, y_centers) -> "VectorGridSpec":
        """Grid whose cell EDGES are extrapolated from coordinate
        centroids — the reference's ``set_extrapolated_bounds``
        (``variable/base.py:945-975`` via ``get_bounds_from_1d``,
        ``util/helpers.py:195-258``): interior edges are two-point means,
        end edges mirror the first/last midpoint. CF files routinely ship
        center coordinates without bounds; this is how they become
        clip-able cell polygons."""
        return cls.from_edges(
            edges_from_centroids(x_centers), edges_from_centroids(y_centers)
        )

    @property
    def nx(self) -> int:
        return len(self.x_edges) - 1

    @property
    def ny(self) -> int:
        return len(self.y_edges) - 1

    def xb(self) -> np.ndarray:
        return np.asarray(self.x_edges, dtype="f8")

    def yb(self) -> np.ndarray:
        return np.asarray(self.y_edges, dtype="f8")

    def cell_of(self, lon: np.ndarray, lat: np.ndarray):
        """searchsorted assignment: O(log n) per point, vectorized; -1 marks
        out-of-grid. ``side='right'`` ⇒ a point exactly on an interior edge
        belongs to the cell whose lower bound it is (lb <= v < ub)."""
        cx = np.searchsorted(self.xb(), np.asarray(lon, "f8"), side="right") - 1
        cy = np.searchsorted(self.yb(), np.asarray(lat, "f8"), side="right") - 1
        cx = np.where((cx < 0) | (cx >= self.nx), -1, cx).astype("i8")
        cy = np.where((cy < 0) | (cy >= self.ny), -1, cy).astype("i8")
        return cy, cx

    def bounds(self, cy, cx):
        xb, yb = self.xb(), self.yb()
        cy = np.asarray(cy, dtype="i8")
        cx = np.asarray(cx, dtype="i8")
        return xb[cx], yb[cy], xb[cx + 1], yb[cy + 1]

    def centroid(self, cy, cx):
        minx, miny, maxx, maxy = self.bounds(cy, cx)
        return (miny + maxy) / 2.0, (minx + maxx) / 2.0

    def covering_index_ranges(
        self, minx: float, miny: float, maxx: float, maxy: float
    ) -> tuple[int, int, int, int]:
        """(x0, x1, y0, y1) inclusive index ranges of cells whose box
        intersects the given bbox (closed test)."""
        xb, yb = self.xb(), self.yb()
        # closed test: cell x intersects iff xb[x] <= maxx AND xb[x+1] >= minx
        x0 = max(int(np.searchsorted(xb, minx, side="left")) - 1, 0)
        x1 = min(int(np.searchsorted(xb, maxx, side="right")) - 1, self.nx - 1)
        y0 = max(int(np.searchsorted(yb, miny, side="left")) - 1, 0)
        y1 = min(int(np.searchsorted(yb, maxy, side="right")) - 1, self.ny - 1)
        return x0, x1, y0, y1


# ---- Morton encoding (vectorized, 32 bits per axis → 64-bit cell id) ----

_M1 = np.uint64(0x5555555555555555)
_M2 = np.uint64(0x3333333333333333)
_M4 = np.uint64(0x0F0F0F0F0F0F0F0F)
_M8 = np.uint64(0x00FF00FF00FF00FF)
_M16 = np.uint64(0x0000FFFF0000FFFF)


def _part1by1(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.uint64)
    v = (v | (v << np.uint64(16))) & _M16
    v = (v | (v << np.uint64(8))) & _M8
    v = (v | (v << np.uint64(4))) & _M4
    v = (v | (v << np.uint64(2))) & _M2
    v = (v | (v << np.uint64(1))) & _M1
    return v


def _unpart1by1(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.uint64) & _M1
    v = (v | (v >> np.uint64(1))) & _M2
    v = (v | (v >> np.uint64(2))) & _M4
    v = (v | (v >> np.uint64(4))) & _M8
    v = (v | (v >> np.uint64(8))) & _M16
    v = (v | (v >> np.uint64(16))) & np.uint64(0xFFFFFFFF)
    return v


def zencode(cy: np.ndarray, cx: np.ndarray) -> np.ndarray:
    """Interleave (cy, cx) → int64 Morton cell id. Negative/out-of-grid
    indices map to -1 (callers filter)."""
    cy = np.asarray(cy, dtype="i8")
    cx = np.asarray(cx, dtype="i8")
    bad = (cy < 0) | (cx < 0) | (cy >= 1 << 31) | (cx >= 1 << 31)
    code = (_part1by1(np.where(bad, 0, cy).astype(np.uint64)) << np.uint64(1)) | _part1by1(
        np.where(bad, 0, cx).astype(np.uint64)
    )
    out = code.astype("i8")
    out[bad] = -1
    return out


def zdecode(z: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    z = np.asarray(z, dtype="i8").astype(np.uint64)
    cx = _unpart1by1(z)
    cy = _unpart1by1(z >> np.uint64(1))
    return cy.astype("i8"), cx.astype("i8")


def zprefix(z: np.ndarray, level_drop: int = 4) -> np.ndarray:
    """Parent cell id: drop ``level_drop`` Z-levels (2*level_drop low bits).
    The coarse key for salting / tile grouping."""
    return np.asarray(z, dtype="i8") >> np.int64(2 * level_drop)


# ---- polygon covering (driver-side, broadcast) ----

def covering_cells(
    spec: GridSpec, rings: list[np.ndarray], refine: bool = True
) -> np.ndarray:
    """Cell ids whose box intersects the polygon (closed test — a superset
    of any keep_touches choice; the exact UDF refines). Mirrors the
    reference's buffered-envelope "hint mask" (``grid.py:1234-1272``) but as
    an explicit broadcast cell set."""
    rings = G.close_rings(rings)
    pts = np.vstack(rings)
    minx, miny = pts[:, 0].min(), pts[:, 1].min()
    maxx, maxy = pts[:, 0].max(), pts[:, 1].max()
    # min sides use ceil-1, NOT floor: for an edge-ALIGNED selection,
    # floor excludes the cell whose east/north edge touches the selection
    # while the floor-max side includes its west/south twin — keep_touches
    # subsets were asymmetric (west/south touchers silently dropped; the
    # vector grid's searchsorted(left)-1 covering was already correct —
    # r4 review finding, regression-tested)
    x0 = max(int(np.ceil((minx - spec.lon0) / spec.res)) - 1, 0)
    x1 = min(int(np.floor((maxx - spec.lon0) / spec.res)), spec.nx - 1)
    y0 = max(int(np.ceil((miny - spec.lat0) / spec.res)) - 1, 0)
    y1 = min(int(np.floor((maxy - spec.lat0) / spec.res)), spec.ny - 1)
    if x1 < x0 or y1 < y0:
        return np.empty(0, dtype="i8")
    yy, xx = np.meshgrid(np.arange(y0, y1 + 1), np.arange(x0, x1 + 1), indexing="ij")
    cy, cx = yy.ravel(), xx.ravel()
    if refine and not G._rings_is_axis_rect(rings):
        bminx, bminy, bmaxx, bmaxy = spec.bounds(cy, cx)
        keep, _ = G.boxes_intersect_polygon(
            bminx, bminy, bmaxx, bmaxy, rings, keep_touches=True
        )
        cy, cx = cy[keep], cx[keep]
    return zencode(cy, cx)


def covering_cells_split(
    spec: GridSpec, rings: list[np.ndarray]
) -> tuple[np.ndarray, np.ndarray]:
    """Split the polygon covering into (interior, boundary) cell ids.

    Interior cells lie STRICTLY inside the polygon — rows in them need no
    exact point-in-polygon refine (they skip the Arrow transfer entirely;
    at fine grids the interior is O(area/res²) cells vs O(perimeter/res)
    boundary cells, so this is the bulk of the corpus). Classification is
    conservative with no false interiors:

    * every cell whose 1-cell-dilated window overlaps ANY ring segment's
      bbox is marked possible-boundary (a superset of cells the boundary
      actually crosses — the polygon edge cannot enter a cell without its
      segment bbox overlapping the dilated window);
    * unmarked covering cells are wholly inside or outside; the center
      point's ray-cast decides (holes included). Center-outside unmarked
      cells (cannot occur for a true covering) fall back to boundary.
    """
    rings = G.close_rings(rings)
    cov = covering_cells(spec, rings)
    if len(cov) == 0:
        return cov, cov
    cy, cx = zdecode(cov)
    y0, y1 = int(cy.min()), int(cy.max())
    x0, x1 = int(cx.min()), int(cx.max())
    marked = np.zeros((y1 - y0 + 1, x1 - x0 + 1), dtype=bool)
    for ring in rings:
        r = np.asarray(ring, dtype="f8")
        sx0 = np.minimum(r[:-1, 0], r[1:, 0])
        sx1 = np.maximum(r[:-1, 0], r[1:, 0])
        sy0 = np.minimum(r[:-1, 1], r[1:, 1])
        sy1 = np.maximum(r[:-1, 1], r[1:, 1])
        ix0 = np.floor((sx0 - spec.lon0) / spec.res).astype("i8") - 1
        ix1 = np.floor((sx1 - spec.lon0) / spec.res).astype("i8") + 1
        iy0 = np.floor((sy0 - spec.lat0) / spec.res).astype("i8") - 1
        iy1 = np.floor((sy1 - spec.lat0) / spec.res).astype("i8") + 1
        ix0 = np.clip(ix0, x0, x1) - x0
        ix1 = np.clip(ix1, x0, x1) - x0
        iy0 = np.clip(iy0, y0, y1) - y0
        iy1 = np.clip(iy1, y0, y1) - y0
        for a, b, c, d in zip(iy0, iy1, ix0, ix1):
            marked[a:b + 1, c:d + 1] = True
    m = marked[cy - y0, cx - x0]
    ccx = spec.lon0 + (cx + 0.5) * spec.res
    ccy = spec.lat0 + (cy + 0.5) * spec.res
    inside = np.zeros(len(cov), dtype=bool)
    if (~m).any():
        inside[~m] = G.points_in_polygon(
            ccx[~m], ccy[~m], [np.asarray(r, dtype="f8") for r in rings], True
        )
    interior = (~m) & inside
    return cov[interior], cov[~interior]


def covering_z_ranges(
    spec,
    rings: list[np.ndarray],
    max_cells: int = 512,
    max_ranges: int | None = None,
) -> list[tuple[int, int]]:
    """Adaptive multi-resolution Z-range covering of a polygon — the S2
    ``RegionCoverer`` analogue (the north rule's H3/S2 covering at scale).

    Quadtree descent over the Morton key space: a quad block wholly inside
    the polygon is emitted as ONE contiguous Z-key run (an aligned s×s
    block of cells is exactly the run ``[morton(y0,x0),
    morton(y0,x0)+s²-1]`` when y0, x0 are multiples of s); a disjoint
    block is dropped; a boundary block recurses until cell level or the
    ``max_cells`` node budget. The result is a sorted, disjoint,
    adjacent-merged list of inclusive ``(lo, hi)`` key intervals:

    * size is O(max_cells) for ANY polygon — a continent-sized selection
      on a fine grid costs a bounded predicate, not the O(area/res²) flat
      cell enumeration of :func:`covering_cells`;
    * exactness: every grid cell whose box intersects the polygon (closed
      test) has its key inside some interval — the same superset contract
      as the flat covering, so the exact refine is unchanged. With an
      unlimited budget the expanded intervals equal the flat covering on
      valid grid cells (pytest property); a small budget only COARSENS
      (adds keys), never drops;
    * the intervals double as parquet min/max-stat pruning predicates
      over a :func:`ocgis_spark.operators.layout.zorder_write` layout
      (``polygon_scan_zordered``) — generalizing the bbox-only
      ``morton_ranges`` (layout.py) to arbitrary selection polygons.

    Works for both :class:`GridSpec` (uniform — edges synthesized) and
    :class:`VectorGridSpec` (stored edge vectors). Blocks straddling the
    grid's east/north boundary are classified by their grid-clipped
    geographic box; their full index-space run is emitted (cells past
    ``nx``/``ny`` never occur in data). Mirrors the reference's
    buffered-envelope hint mask (``grid.py:1234-1272``) at the coarse end
    and its R-tree thinning (``spatial/index.py:5-87``) at the fine end,
    in one shuffle-free representation.
    """
    rings = G.close_rings(rings)
    nx, ny = spec.nx, spec.ny
    if hasattr(spec, "xb"):
        xe, ye = spec.xb(), spec.yb()
    else:
        xe = spec.lon0 + np.arange(nx + 1) * spec.res
        ye = spec.lat0 + np.arange(ny + 1) * spec.res
    level = max(int(np.ceil(np.log2(max(nx, ny)))), 0)

    emitted: list[tuple[np.ndarray, np.ndarray, int]] = []
    n_emitted = 0
    qy = np.zeros(1, dtype="i8")
    qx = np.zeros(1, dtype="i8")
    while True:
        s = np.int64(1) << level
        # grid-clipped geographic box of each block (out-of-grid → empty)
        x0 = np.minimum(qx * s, nx)
        x1 = np.minimum(qx * s + s, nx)
        y0 = np.minimum(qy * s, ny)
        y1 = np.minimum(qy * s + s, ny)
        valid = (x0 < x1) & (y0 < y1)
        qy, qx = qy[valid], qx[valid]
        if len(qy) == 0:
            break
        x0, x1, y0, y1 = x0[valid], x1[valid], y0[valid], y1[valid]
        bminx, bmaxx = xe[x0], xe[x1]
        bminy, bmaxy = ye[y0], ye[y1]
        keep, areas = G.boxes_intersect_polygon(
            bminx, bminy, bmaxx, bmaxy, rings, keep_touches=True
        )
        box_area = (bmaxx - bminx) * (bmaxy - bminy)
        # conservative: FP shortfall demotes full→partial (still exact)
        full = keep & (areas >= box_area * (1.0 - 1e-9) - G.EPS_AREA)
        if level == 0:
            full = keep  # cell level: the closed intersect test decides
        if full.any():
            emitted.append((qy[full], qx[full], level))
            n_emitted += int(full.sum())
        part = keep & ~full
        qy, qx = qy[part], qx[part]
        if len(qy) == 0:
            break
        if level == 0 or n_emitted + 4 * len(qy) > max_cells:
            emitted.append((qy, qx, level))  # coarse superset: budget hit
            break
        level -= 1
        qy = (qy[:, None] * 2 + np.array([0, 0, 1, 1], dtype="i8")).ravel()
        qx = (qx[:, None] * 2 + np.array([0, 1, 0, 1], dtype="i8")).ravel()
    ranges = _nodes_to_ranges(emitted)
    if max_ranges is not None:
        ranges = _coarsen_ranges(ranges, max_ranges)
    return ranges


def _coarsen_ranges(
    ranges: list[tuple[int, int]], max_ranges: int
) -> list[tuple[int, int]]:
    """Merge the smallest inter-interval gaps until ≤ max_ranges remain
    (``layout.morton_ranges``'s coarsening rule) — only ADDS keys, so the
    superset contract holds; used to bound scan-predicate size."""
    merged = [list(r) for r in ranges]
    while len(merged) > max_ranges:
        i = min(
            range(len(merged) - 1),
            key=lambda i: merged[i + 1][0] - merged[i][1],
        )
        merged[i][1] = merged[i + 1][1]
        del merged[i + 1]
    return [(lo, hi) for lo, hi in merged]


def _nodes_to_ranges(
    nodes: list[tuple[np.ndarray, np.ndarray, int]]
) -> list[tuple[int, int]]:
    """Mixed-level quad nodes → sorted disjoint adjacent-merged inclusive
    Morton-key intervals. Node (qy, qx, k) covers the contiguous run of
    4**k keys starting at morton(qy<<k, qx<<k)."""
    runs: list[tuple[int, int]] = []
    for qy, qx, k in nodes:
        los = zencode(qy << np.int64(k), qx << np.int64(k))
        span = (np.int64(1) << np.int64(2 * k)) - 1
        for lo in los.tolist():
            runs.append((lo, lo + int(span)))
    runs.sort()
    merged: list[list[int]] = []
    for lo, hi in runs:
        if merged and lo == merged[-1][1] + 1:
            merged[-1][1] = hi
        else:
            merged.append([lo, hi])
    return [(lo, hi) for lo, hi in merged]


def ring_cells(spec: GridSpec, cy: int, cx: int, k: int) -> np.ndarray:
    """Chebyshev disk of radius k around (cy, cx), clipped to the grid —
    kNN candidate expansion (H3 grid_disk analogue)."""
    ys = np.arange(max(cy - k, 0), min(cy + k, spec.ny - 1) + 1)
    xs = np.arange(max(cx - k, 0), min(cx + k, spec.nx - 1) + 1)
    yy, xx = np.meshgrid(ys, xs, indexing="ij")
    return zencode(yy.ravel(), xx.ravel())


def edges_from_centroids(centers) -> np.ndarray:
    """n centroids → n+1 ascending cell edges: interior edges are the
    midpoints of consecutive centroids; the two end edges mirror the
    nearest midpoint about the end centroid (reference
    ``get_bounds_vector_from_centroids``, ``util/helpers.py:224-258``)."""
    c = np.asarray(centers, dtype="f8")
    if c.ndim != 1 or len(c) < 2:
        raise ValueError("centroid arrays must be 1-D with length >= 2")
    mids = (c[:-1] + c[1:]) / 2.0
    first = c[0] - (mids[0] - c[0])
    last = c[-1] + (c[-1] - mids[-1])
    return np.concatenate([[first], mids, [last]])
