"""Two-phase spatial subset — the engine core (SURVEY.md §2.3).

Reference semantics re-expressed Spark-first:

* ``SpatialSubsetOperation.get_spatial_subset`` ('intersects' / 'clip'),
  ``/root/reference/src/ocgis/spatial/spatial_subset.py:53-175``;
* bbox "hint mask" pre-filter (``spatial/grid.py:633-661,1234-1272``) →
  **phase 1**: broadcast join of row cell ids against the driver-side cell
  covering of the query polygon (H3-covering analogue, Z-grid here);
* exact PIP / box-intersect refine with ``keep_touches`` auto-rules
  (``grid.py:627-631``: True for point abstraction, False for polygon) →
  **phase 2**: Arrow-vectorized pandas UDF over candidate rows only;
* ``optimized_bbox_subset`` fast path (``ops/core.py:116``) → pure range
  predicates, no geometry at all;
* clip = intersection area per surviving cell (``grid.py:688-705``);
* ``allow_empty=False`` raising ``ExtentError`` (``ops/engine.py:497-506``).

Axis-aligned-rectangle query polygons take a no-UDF fast path: both phases
collapse to Catalyst range predicates (whole-stage codegen, pushed to the
parquet scan).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..geo import geometry as G
from ..geo.cellindex import (
    GridSpec,
    covering_cells,
    covering_cells_split,
    zdecode,
)


class ExtentError(RuntimeError):
    """Empty spatial subset with allow_empty=False (ops/engine.py:497-506)."""


def encode_cells(
    df: DataFrame, grid: GridSpec, lon: str = "lon", lat: str = "lat"
) -> DataFrame:
    """Attach (cell_x, cell_y, cell_id) — pure JVM arithmetic, no UDF.

    OFF-GRID rows get ``cell_id = -1`` (the vector twin's sentinel,
    ``vectorgrid.encode_cells``): the raw ``cy*nx + cx`` of an off-grid
    index COLLIDES with a valid interior id (cx = nx lands on cell
    (cy+1, 0)) and silently polluted groupBy/join consumers — r4 review
    finding. cell_x/cell_y keep their raw values for diagnostics."""
    cx = F.floor((F.col(lon) - F.lit(grid.lon0)) / F.lit(grid.res)).cast("int")
    cy = F.floor((F.col(lat) - F.lit(grid.lat0)) / F.lit(grid.res)).cast("int")
    out = df.withColumn("cell_x", cx).withColumn("cell_y", cy)
    in_grid = (
        (F.col("cell_x") >= 0) & (F.col("cell_x") < grid.nx)
        & (F.col("cell_y") >= 0) & (F.col("cell_y") < grid.ny)
    )
    return out.withColumn(
        "cell_id",
        F.when(
            in_grid,
            (F.col("cell_y") * F.lit(grid.nx) + F.col("cell_x")).cast("bigint"),
        ).otherwise(F.lit(-1).cast("bigint")),
    )


#: flat-covering size above which the (ugid, cell) broadcast is replaced
#: by a bounded strategy (Z-range intervals, or the envelope degrade past
#: the Morton domain) — ONE home for the threshold (r4s10 review)
_COVERING_BROADCAST_CELLS = 2_000_000


def _flat_covering_estimate(grid, rings: list[np.ndarray]) -> float:
    """Cheap upper estimate of the flat covering size: the GRID-CLIPPED
    bbox cell count (what ``covering_cells`` would enumerate) — shared by
    the single- and multi-geometry phase-1 routers so their thresholds
    cannot drift (r4s10 review)."""
    minx, miny, maxx, maxy = _rings_bbox(rings)
    cw = max(min(maxx, grid.lon1) - max(minx, grid.lon0), 0.0)
    ch = max(min(maxy, grid.lat1) - max(miny, grid.lat0), 0.0)
    return (cw / grid.res + 2.0) * (ch / grid.res + 2.0)


def _rings_bbox(rings: list[np.ndarray]) -> tuple[float, float, float, float]:
    pts = np.vstack(rings)
    return (
        float(pts[:, 0].min()),
        float(pts[:, 1].min()),
        float(pts[:, 0].max()),
        float(pts[:, 1].max()),
    )


def coarse_filter(
    spark: SparkSession,
    df: DataFrame,
    grid: GridSpec,
    rings: list[np.ndarray],
) -> DataFrame:
    """Phase 1: semi-join rows whose cell is in the polygon's cell covering.
    The covering is computed driver-side (small) and broadcast — the
    distributed replacement for the reference's R-tree
    (``spatial/index.py:5-87``)."""
    minx, miny, maxx, maxy = _rings_bbox(rings)
    est = _flat_covering_estimate(grid, rings)
    if est > _COVERING_BROADCAST_CELLS:
        if max(grid.nx, grid.ny) <= 65536:
            # covering too large to broadcast (very fine grid or a
            # near-global polygon): bounded adaptive Z-range predicate —
            # decided BEFORE enumerating the flat covering, so the driver
            # never materializes the O(area/res²) cell set at all
            return zrange_filter(df, grid, rings)
        # >16-bit grid indices (Morton domain exceeded) AND a flat
        # covering too large to broadcast: degrade to the envelope range
        # predicate — decided from the ESTIMATE, never after enumerating
        # (covering_cells meshgrids the clipped bbox; on this branch that
        # is billions of cells and hangs the driver — r4s11 review, the
        # single-geometry twin of the spatial_subset_many fix). The
        # in-grid guard keeps the branch's row universe identical to the
        # covering/zranges branches (off-grid rows never survive phase 1).
        in_grid = (
            F.col("cell_x").between(0, grid.nx - 1)
            & F.col("cell_y").between(0, grid.ny - 1)
        )
        return cell_bounds(df.filter(in_grid), grid).filter(
            (F.col("lon_lb") <= maxx) & (F.col("lon_ub") >= minx)
            & (F.col("lat_lb") <= maxy) & (F.col("lat_ub") >= miny)
        ).drop("lon_lb", "lon_ub", "lat_lb", "lat_ub")
    cells = covering_cells(grid, rings)
    if len(cells) == 0:
        return df.limit(0)
    cy, cx = zdecode(cells)
    # pandas frame → one Arrow block transfer (not py4j row-by-row)
    cov = spark.createDataFrame(
        pd.DataFrame({"cov_y": cy.astype("int32"), "cov_x": cx.astype("int32")})
    )
    return df.join(
        F.broadcast(cov),
        (df["cell_y"] == cov["cov_y"]) & (df["cell_x"] == cov["cov_x"]),
        "leftsemi",
    )


def zrange_filter(
    df: DataFrame,
    grid,
    rings: list[np.ndarray],
    max_cells: int = 512,
    cell_x: str = "cell_x",
    cell_y: str = "cell_y",
) -> DataFrame:
    """Phase 1 via the adaptive multi-resolution Z-range covering
    (:func:`ocgis_spark.geo.cellindex.covering_z_ranges`, the S2
    RegionCoverer analogue): a bounded OR-of-BETWEEN predicate over the
    in-plan Morton key — whole-stage codegen, NO join, NO shuffle, and
    O(max_cells) predicate size for ANY selection polygon. This replaces
    the unbounded envelope fallback for coverings too large to broadcast:
    a diagonal or L-shaped continent-scale selection over-selects the
    bbox envelope arbitrarily, while the Z ranges track the polygon to
    within the node budget. Works for uniform and vector grids whose
    index domain fits 16 bits per axis (the Morton column's domain —
    ``layout.morton_key``).

    Same superset contract as ``coarse_filter`` (closed intersect test,
    valid grid cells only — the in-grid guard below mirrors the covering
    semi-join's implicit drop of off-grid rows); the exact refine is
    unchanged. Bonus at 100 TB: the identical interval list prunes a
    Z-ordered parquet layout via min/max statistics
    (``layout.polygon_scan_zordered``).

    Plan shape (deliberate): the Morton key is PROJECTED once, then a
    broadcast nested-loop SEMI-join against the ≤``max_cells``-row
    interval table applies ``_z BETWEEN lo AND hi``. An inline
    OR-of-BETWEEN predicate would re-expand the ~60-node spread
    expression per comparison — FilterExec does no subexpression
    elimination, so even ~6 intervals blow janino's 64 KB method limit
    and the whole stage silently degrades to interpreted execution
    (measured; regression-tested with codegen fallback disabled).
    ProjectExec eliminates the shared subtrees, the join condition
    references the materialized ``_z`` attribute (alias substitution
    does not cross a join), and per row the probe is at most
    ``max_cells`` integer comparisons. No shuffle — the only exchange is
    the interval-table broadcast. Delegates to :func:`zrange_filter_many`
    with one dummy ugid (a row matches at most one DISJOINT interval, so
    the inner join is multiplicity-identical to a semi join here —
    single implementation, r4s10 review)."""
    out = zrange_filter_many(
        df, grid, [(0, rings)], max_cells=max_cells,
        cell_x=cell_x, cell_y=cell_y, ugid_col="_zr_ugid",
    )
    return out.drop("_zr_ugid")


def zrange_filter_many(
    df: DataFrame,
    grid,
    polys: list[tuple[int, list[np.ndarray]]],
    max_cells: int = 512,
    cell_x: str = "cell_x",
    cell_y: str = "cell_y",
    ugid_col: str = "ugid",
) -> DataFrame:
    """Multi-geometry twin of :func:`zrange_filter`: per-polygon adaptive
    Z-range coverings stacked into ONE broadcast interval table
    (ugid, z_lo, z_hi); candidates = project the Morton key once +
    broadcast nested-loop INNER join (a row matching k polygons appears
    k times, carrying ``ugid`` — the ``_covering_many`` contract).
    Interval-table size is O(n_polys · max_cells) for ANY polygon set,
    vs the flat covering table's O(Σ area/res²). Same exact-refine
    contract as the covering path; same codegen rationale as
    ``zrange_filter`` (the key is projected, never inlined per branch).
    ``ugid_col`` renames the emitted selection-id attribute —
    :func:`zrange_filter` delegates with a private name so inputs that
    already carry ``ugid`` keep their column (r4s11 review)."""
    from ..geo.cellindex import covering_z_ranges
    from .layout import morton_key

    if max(grid.nx, grid.ny) > 65536:
        raise ValueError(
            "zrange_filter_many: grid indices exceed the 16-bit Morton domain"
        )
    if ugid_col in df.columns:
        # the interval join would emit TWO ambiguous attributes (and a
        # downstream drop would remove both) — fail loudly instead of
        # silently corrupting the caller's column
        raise ValueError(
            f"zrange_filter_many: input already has a {ugid_col!r} column "
            "— rename it or pass a different ugid_col"
        )
    ug, lo_, hi_ = [], [], []
    for ugid, rings in polys:
        for lo, hi in covering_z_ranges(grid, rings, max_cells):
            ug.append(int(ugid))
            lo_.append(lo)
            hi_.append(hi)
    spark = df.sparkSession
    if not ug:
        return df.limit(0).withColumn(ugid_col, F.lit(0))
    rng = spark.createDataFrame(
        pd.DataFrame({ugid_col: ug, "z_lo": lo_, "z_hi": hi_}),
        schema=f"{ugid_col} int, z_lo bigint, z_hi bigint",
    )
    in_grid = (
        F.col(cell_x).between(0, grid.nx - 1)
        & F.col(cell_y).between(0, grid.ny - 1)
    )
    keyed = df.filter(in_grid).withColumn(
        "_z", morton_key(F.col(cell_x), F.col(cell_y))
    )
    return keyed.join(
        F.broadcast(rng),
        (F.col("_z") >= F.col("z_lo")) & (F.col("_z") <= F.col("z_hi")),
        "inner",
    ).drop("_z", "z_lo", "z_hi")


def _cell_semijoin(
    spark: SparkSession, df: DataFrame, zcells: np.ndarray
) -> DataFrame:
    """leftsemi-join rows whose (cell_y, cell_x) is in the z-coded set
    (one Arrow block → broadcast, same shape as coarse_filter)."""
    if len(zcells) == 0:
        return df.limit(0)
    cy, cx = zdecode(zcells)
    cov = spark.createDataFrame(
        pd.DataFrame({"cov_y": cy.astype("int32"), "cov_x": cx.astype("int32")})
    )
    return df.join(
        F.broadcast(cov),
        (df["cell_y"] == cov["cov_y"]) & (df["cell_x"] == cov["cov_x"]),
        "leftsemi",
    )


def bbox_filter(
    df: DataFrame,
    bbox: tuple[float, float, float, float],
    lon: str = "lon",
    lat: str = "lat",
    closed: bool = True,
) -> DataFrame:
    """``optimized_bbox_subset``: range predicates only — Catalyst pushes
    these into the parquet scan (PushedFilters)."""
    minx, miny, maxx, maxy = bbox
    if closed:
        cond = (
            (F.col(lon) >= minx) & (F.col(lon) <= maxx)
            & (F.col(lat) >= miny) & (F.col(lat) <= maxy)
        )
    else:
        cond = (
            (F.col(lon) > minx) & (F.col(lon) < maxx)
            & (F.col(lat) > miny) & (F.col(lat) < maxy)
        )
    return df.filter(cond)


def _is_axis_rect(rings: list[np.ndarray]) -> bool:
    return G._rings_is_axis_rect(rings)


def interior_raster(
    int_cy: np.ndarray, int_cx: np.ndarray
) -> tuple[int, int, np.ndarray] | None:
    """(y0, x0, bool raster) lookup table over the interior covering cells
    — shipped into the PIP UDF closure so interior rows cost one O(1)
    array index instead of an O(ring segments) ray cast."""
    if len(int_cy) == 0:
        return None
    y0, x0 = int(int_cy.min()), int(int_cx.min())
    h = int(int_cy.max()) - y0 + 1
    w = int(int_cx.max()) - x0 + 1
    # the raster is BBOX-sized, not covering-sized: a thin diagonal
    # selection on a fine grid passes the covering-count gate yet spans
    # the whole grid's bbox — a multi-GB closure shipped to every Arrow
    # worker (r4 review finding). Fall back to the plain ray cast.
    if h * w > 4_000_000:
        return None
    R = np.zeros((h, w), dtype=bool)
    R[int_cy - y0, int_cx - x0] = True
    return y0, x0, R


def convex_halfplane_cond(ring: np.ndarray, lon: str, lat: str,
                          keep_touches: bool):
    """Half-plane conjunction for one CONVEX ring as a Catalyst predicate.
    Closes the ring (an open ring's missing closing edge silently widened
    the subset) and skips zero-length edges (whose d == 0 everywhere
    would, with keep_touches=False, drop EVERY row) — r4 review findings,
    shared by the uniform and vector-grid fast paths."""
    ring = G.close_rings([ring])[0]
    cond = None
    for (x1, y1), (x2, y2) in zip(ring[:-1], ring[1:]):
        if x1 == x2 and y1 == y2:
            continue
        d = (F.lit(float(x2)) - F.lit(float(x1))) * (
            F.col(lat) - F.lit(float(y1))
        ) - (F.lit(float(y2)) - F.lit(float(y1))) * (
            F.col(lon) - F.lit(float(x1))
        )
        term = (d >= 0.0) if keep_touches else (d > 0.0)
        cond = term if cond is None else (cond & term)
    if cond is None:
        raise ValueError("convex ring has no non-degenerate edges")
    return cond


def refine_points(
    df: DataFrame,
    rings: list[np.ndarray],
    keep_touches: bool = True,
    lon: str = "lon",
    lat: str = "lat",
    interior: tuple[int, int, np.ndarray] | None = None,
    cell_y: str = "cell_y",
    cell_x: str = "cell_x",
) -> DataFrame:
    """Phase 2 for point abstraction: exact PIP on candidates.
    Rect polygons → pure SQL; general polygons → Arrow pandas UDF
    (vectorized ray casting, no per-row Python).

    ``interior`` (from :func:`interior_raster` over the
    ``covering_cells_split`` interior set): rows whose cell is strictly
    inside the polygon short-circuit to True with one raster lookup — the
    ray cast runs only on boundary-cell rows, so per-row Python work
    scales with the polygon PERIMETER, not its area. Matters for
    many-segment selection polygons (coastlines): the ray cast is
    O(segments) per row, the lookup O(1). Same one-scan plan shape."""
    if _is_axis_rect(rings):
        return bbox_filter(df, _rings_bbox(rings), lon, lat, closed=keep_touches)

    rings_bc = [np.asarray(r, dtype="f8") for r in rings]
    if len(rings_bc) == 1 and G.ring_is_convex_ccw(rings_bc[0]):
        # convex fast path: half-plane conjunction as pure Catalyst
        # expressions — whole-stage codegen, NO Python in the hot path,
        # and bit-identical to the SQL oracle predicate.
        return df.filter(
            convex_halfplane_cond(rings_bc[0], lon, lat, keep_touches)
        )

    if interior is not None:
        iy0, ix0, R = interior
        H, W = R.shape

        @F.pandas_udf("boolean")
        def pip_int(
            lon_s: pd.Series, lat_s: pd.Series,
            cy_s: pd.Series, cx_s: pd.Series,
        ) -> pd.Series:
            px = lon_s.to_numpy("f8")
            py = lat_s.to_numpy("f8")
            ry = cy_s.to_numpy("i8") - iy0
            rx = cx_s.to_numpy("i8") - ix0
            inb = (ry >= 0) & (ry < H) & (rx >= 0) & (rx < W)
            mask = np.zeros(len(px), dtype=bool)
            mask[inb] = R[ry[inb], rx[inb]]
            rest = ~mask
            if rest.any():
                mask[rest] = G.points_in_polygon(
                    px[rest], py[rest], rings_bc, keep_touches
                )
            return pd.Series(mask)

        return df.filter(
            pip_int(F.col(lon), F.col(lat), F.col(cell_y), F.col(cell_x))
        )

    @F.pandas_udf("boolean")
    def pip(lon_s: pd.Series, lat_s: pd.Series) -> pd.Series:
        px = lon_s.to_numpy("f8")
        py = lat_s.to_numpy("f8")
        mask = G.points_in_polygon(px, py, rings_bc, keep_touches)
        return pd.Series(mask)

    return df.filter(pip(F.col(lon), F.col(lat)))


def cell_bounds(df: DataFrame, grid: GridSpec) -> DataFrame:
    """Attach the owning cell's bounds (ocgis bounds variables,
    ``variable/base.py:1429``) — pure arithmetic."""
    return (
        df.withColumn("lon_lb", F.lit(grid.lon0) + F.col("cell_x") * F.lit(grid.res))
        .withColumn("lon_ub", F.lit(grid.lon0) + (F.col("cell_x") + 1) * F.lit(grid.res))
        .withColumn("lat_lb", F.lit(grid.lat0) + F.col("cell_y") * F.lit(grid.res))
        .withColumn("lat_ub", F.lit(grid.lat0) + (F.col("cell_y") + 1) * F.lit(grid.res))
    )


def refine_boxes(
    df: DataFrame,
    grid: GridSpec,
    rings: list[np.ndarray],
    keep_touches: bool = False,
    with_area: bool = False,
) -> DataFrame:
    """Phase 2 for polygon abstraction: cell-box vs polygon intersect, the
    ``GridGeometryProcessor`` semantics (``grid.py:31-100,555-724``).
    Needs ``cell_x``/``cell_y``; emits ``clip_area`` when ``with_area``.

    Rect fast path: overlap area in closed form (greatest/least — JVM).
    """
    df = cell_bounds(df, grid)
    if _is_axis_rect(rings):
        minx, miny, maxx, maxy = _rings_bbox(rings)
        ox = F.least(F.col("lon_ub"), F.lit(maxx)) - F.greatest(F.col("lon_lb"), F.lit(minx))
        oy = F.least(F.col("lat_ub"), F.lit(maxy)) - F.greatest(F.col("lat_lb"), F.lit(miny))
        area = F.greatest(ox, F.lit(0.0)) * F.greatest(oy, F.lit(0.0))
        out = df.withColumn("clip_area", area)
        if keep_touches:
            keep = (
                (F.col("lon_lb") <= maxx) & (F.col("lon_ub") >= minx)
                & (F.col("lat_lb") <= maxy) & (F.col("lat_ub") >= miny)
            )
        else:
            keep = F.col("clip_area") > G.EPS_AREA
        out = out.filter(keep)
        return out if with_area else out.drop("clip_area")

    rings_bc = [np.asarray(r, dtype="f8") for r in rings]
    kt = keep_touches

    @F.pandas_udf("double")
    def clip_area_udf(
        lon_lb: pd.Series, lat_lb: pd.Series, lon_ub: pd.Series, lat_ub: pd.Series
    ) -> pd.Series:
        keep, areas = G.boxes_intersect_polygon(
            lon_lb.to_numpy("f8"),
            lat_lb.to_numpy("f8"),
            lon_ub.to_numpy("f8"),
            lat_ub.to_numpy("f8"),
            rings_bc,
            keep_touches=kt,
        )
        out = np.where(keep, areas, -1.0)  # -1 marks "drop"
        return pd.Series(out)

    out = df.withColumn(
        "clip_area",
        clip_area_udf(F.col("lon_lb"), F.col("lat_lb"), F.col("lon_ub"), F.col("lat_ub")),
    ).filter(F.col("clip_area") >= 0.0)
    return out if with_area else out.drop("clip_area")


def clip_disjoint_pieces(
    spark: SparkSession,
    df: DataFrame,
    grid: GridSpec,
    pieces: list[list[np.ndarray]],
    keep_touches: bool = False,
) -> DataFrame:
    """Clip every cell against a set of interior-DISJOINT polygons in ONE
    pass — the dissolved-`agg_selection` execution plan (reference
    ``field.py:422-469`` clips against the one unioned geometry).

    Phase 1 is a single semijoin against the UNION of the pieces' cell
    coverings; phase 2 ships the whole piece list into one Arrow UDF
    closure (CLAUDE.md: lookup structures ride the closure, never extra
    scans) and sums per-piece Sutherland–Hodgman areas per row — exact,
    because the pieces are interior-disjoint by construction. Replaces
    the former per-piece ``spatial_subset`` × ``unionByName`` ×
    ``groupBy``-sum plan: P scans + P Arrow stages + 1 shuffle collapse
    to 1 scan + 1 Arrow stage + 0 shuffles, independent of piece count.
    """
    covs = [covering_cells(grid, rings) for rings in pieces]
    nonempty = [z for z in covs if len(z)]
    if not nonempty:
        return cell_bounds(df.limit(0), grid).withColumn(
            "clip_area", F.lit(0.0)
        )
    allz = np.unique(np.concatenate(nonempty))
    if len(allz) > 2_000_000:
        # covering too large to broadcast: envelope range predicate over
        # all pieces (correct superset; the exact phase refines)
        pts = np.vstack([np.vstack(rings) for rings in pieces])
        minx, miny = pts[:, 0].min(), pts[:, 1].min()
        maxx, maxy = pts[:, 0].max(), pts[:, 1].max()
        cand = cell_bounds(df, grid).filter(
            (F.col("lon_lb") <= maxx) & (F.col("lon_ub") >= minx)
            & (F.col("lat_lb") <= maxy) & (F.col("lat_ub") >= miny)
        )
    else:
        cand = cell_bounds(_cell_semijoin(spark, df, allz), grid)

    pieces_bc = [[np.asarray(r, dtype="f8") for r in rings]
                 for rings in pieces]
    kt = keep_touches

    @F.pandas_udf("double")
    def total_clip_area_udf(
        lon_lb: pd.Series, lat_lb: pd.Series,
        lon_ub: pd.Series, lat_ub: pd.Series,
    ) -> pd.Series:
        lx = lon_lb.to_numpy("f8")
        ly = lat_lb.to_numpy("f8")
        ux = lon_ub.to_numpy("f8")
        uy = lat_ub.to_numpy("f8")
        total = np.zeros(len(lx), dtype="f8")
        keep = np.zeros(len(lx), dtype=bool)
        for rings in pieces_bc:
            k, a = G.boxes_intersect_polygon(
                lx, ly, ux, uy, rings, keep_touches=kt
            )
            total += a
            keep |= k
        return pd.Series(np.where(keep, total, -1.0))  # -1 marks "drop"

    return cand.withColumn(
        "clip_area",
        total_clip_area_udf(
            F.col("lon_lb"), F.col("lat_lb"), F.col("lon_ub"), F.col("lat_ub")
        ),
    ).filter(F.col("clip_area") >= 0.0)


def _covering_many(
    spark: SparkSession,
    grid: GridSpec,
    polys: list[tuple[int, list[np.ndarray]]],
) -> DataFrame:
    """(ugid, cov_y, cov_x) covering table for many polygons, built as one
    pandas frame → single Arrow block transfer to the JVM."""
    ug_parts, cy_parts, cx_parts = [], [], []
    for ugid, rings in polys:
        cells = covering_cells(grid, rings)
        cy, cx = zdecode(cells)
        ug_parts.append(np.full(len(cy), int(ugid), dtype="i4"))
        cy_parts.append(cy.astype("i4"))
        cx_parts.append(cx.astype("i4"))
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "ugid": np.concatenate(ug_parts),
                "cov_y": np.concatenate(cy_parts),
                "cov_x": np.concatenate(cx_parts),
            }
        )
    )


def spatial_subset_many(
    spark: SparkSession,
    df: DataFrame,
    grid: GridSpec,
    polys: list[tuple[int, list[np.ndarray]]],
    abstraction: str = "point",
    keep_touches: bool | None = None,
    lon: str = "lon",
    lat: str = "lat",
    phase1: str = "auto",
    zrange_max_cells: int = 512,
) -> DataFrame:
    """Subset by MANY selection geometries in ONE plan — the
    ``SpatialCollection`` analogue (SURVEY.md §1.4): output rows carry a
    ``ugid`` column; a row matching several geometries appears once per
    match (the reference's per-UGID container tree, flattened).

    Phase 1: one broadcast covering table (ugid, cell) for all polygons —
    or, when the summed flat coverings would be too large to enumerate/
    broadcast (``phase1='auto'`` estimates from the grid-clipped bboxes;
    force with ``phase1='zranges'``), one broadcast INTERVAL table
    (ugid, z_lo, z_hi) from per-polygon adaptive Z-range coverings
    (:func:`zrange_filter`'s multi twin — bounded size for ANY polygon
    set). Phase 2 is identical either way: a single CASE-chained exact
    predicate — rect and convex rings compile to pure Catalyst
    expressions; any non-convex ring falls back to one Arrow pandas UDF
    handling all ugids in a batch. The reference iterates geometries
    serially (``ops/engine.py:287-385``); here all geometries share one
    scan of the big side.
    """
    if keep_touches is None:
        keep_touches = abstraction == "point"
    if phase1 not in ("auto", "covering", "zranges"):
        raise ValueError(
            f"spatial_subset_many: unknown phase1 {phase1!r} "
            "(expected 'auto' | 'covering' | 'zranges')"
        )
    if abstraction == "polygon":
        if phase1 == "zranges":
            raise ValueError(
                "spatial_subset_many: phase1='zranges' is not available "
                "on the polygon-abstraction path (it clips boxes, not "
                "points; use abstraction='point' or phase1='auto')"
            )
        return _subset_many_boxes(spark, df, grid, polys, keep_touches)
    if phase1 == "auto":
        est = sum(_flat_covering_estimate(grid, rings) for _, rings in polys)
        if est <= _COVERING_BROADCAST_CELLS:
            phase1 = "covering"
        elif max(grid.nx, grid.ny) <= 65536:
            phase1 = "zranges"
        else:
            # >16-bit grid indices (Morton domain exceeded) AND a flat
            # covering too large to broadcast: degrade to a per-ugid
            # ENVELOPE join — a k-row broadcast bbox table, the many-
            # geometry twin of coarse_filter's envelope fallback; still
            # a correct superset, phase 2 refines (r4s10 review)
            phase1 = "envelopes"
    if phase1 == "zranges":
        cand = zrange_filter_many(df, grid, polys, max_cells=zrange_max_cells)
    elif phase1 == "envelopes":
        env = spark.createDataFrame(
            pd.DataFrame(
                {
                    "ugid": [int(u) for u, _ in polys],
                    "e_minx": [_rings_bbox(r)[0] for _, r in polys],
                    "e_miny": [_rings_bbox(r)[1] for _, r in polys],
                    "e_maxx": [_rings_bbox(r)[2] for _, r in polys],
                    "e_maxy": [_rings_bbox(r)[3] for _, r in polys],
                }
            ),
            schema="ugid int, e_minx double, e_miny double, "
                   "e_maxx double, e_maxy double",
        )
        # same in-grid guard as the covering/zranges branches: off-grid
        # rows (cell index outside the grid) must not survive phase 1 on
        # ONE branch only, or the result set would depend on which
        # strategy auto-routing picked (r4s11 review)
        in_grid = (
            F.col("cell_x").between(0, grid.nx - 1)
            & F.col("cell_y").between(0, grid.ny - 1)
        )
        cand = df.filter(in_grid).join(
            F.broadcast(env),
            (F.col(lon) >= F.col("e_minx")) & (F.col(lon) <= F.col("e_maxx"))
            & (F.col(lat) >= F.col("e_miny")) & (F.col(lat) <= F.col("e_maxy")),
            "inner",
        ).drop("e_minx", "e_miny", "e_maxx", "e_maxy")
    else:
        cov = _covering_many(spark, grid, polys)
        cand = df.join(
            F.broadcast(cov),
            (df["cell_y"] == cov["cov_y"]) & (df["cell_x"] == cov["cov_x"]),
            "inner",
        ).drop("cov_y", "cov_x")

    exprs = {}
    udf_polys = {}
    for ugid, rings in polys:
        rings = [np.asarray(r, dtype="f8") for r in rings]
        if _is_axis_rect(rings):
            minx, miny, maxx, maxy = _rings_bbox(rings)
            if keep_touches:
                e = (
                    (F.col(lon) >= minx) & (F.col(lon) <= maxx)
                    & (F.col(lat) >= miny) & (F.col(lat) <= maxy)
                )
            else:
                e = (
                    (F.col(lon) > minx) & (F.col(lon) < maxx)
                    & (F.col(lat) > miny) & (F.col(lat) < maxy)
                )
            exprs[ugid] = e
        elif len(rings) == 1 and G.ring_is_convex_ccw(rings[0]):
            exprs[ugid] = convex_halfplane_cond(
                rings[0], lon, lat, keep_touches
            )
        else:
            udf_polys[int(ugid)] = rings

    cond = None
    for ugid, e in exprs.items():
        c = (F.col("ugid") == ugid) & e
        cond = c if cond is None else (cond | c)

    if udf_polys:
        kt = keep_touches
        # per-ugid interior rasters: strictly-inside cells resolve with an
        # O(1) lookup inside the UDF; the O(segments) ray cast runs only
        # on boundary-cell rows (same trick as refine_points(interior=…))
        rasters = {}
        for u, rings in udf_polys.items():
            # estimate BEFORE enumerating — covering_cells_split meshgrids
            # the flat covering, which on a fine grid with a large
            # selection is billions of cells (r4s10 review: the envelope-
            # degrade test hung exactly here). Rasters are an optional
            # accelerator; the UDF ray-casts without one.
            if _flat_covering_estimate(grid, rings) > _COVERING_BROADCAST_CELLS:
                continue
            int_z, bnd_z = covering_cells_split(grid, rings)
            ras = interior_raster(*zdecode(int_z))
            if ras is not None:
                rasters[u] = ras

        @F.pandas_udf("boolean")
        def pip_many(
            ugid_s: pd.Series, lon_s: pd.Series, lat_s: pd.Series,
            cy_s: pd.Series, cx_s: pd.Series,
        ) -> pd.Series:
            px = lon_s.to_numpy("f8")
            py = lat_s.to_numpy("f8")
            cy = cy_s.to_numpy("i8")
            cx = cx_s.to_numpy("i8")
            ug = ugid_s.to_numpy()
            out = np.zeros(len(px), dtype=bool)
            for u, rings in udf_polys.items():
                m = ug == u
                if not m.any():
                    continue
                sub = np.zeros(int(m.sum()), dtype=bool)
                ras = rasters.get(u)
                if ras is not None:
                    y0, x0, R = ras
                    ry = cy[m] - y0
                    rx = cx[m] - x0
                    inb = (
                        (ry >= 0) & (ry < R.shape[0])
                        & (rx >= 0) & (rx < R.shape[1])
                    )
                    sub[inb] = R[ry[inb], rx[inb]]
                rest = ~sub
                if rest.any():
                    sub[rest] = G.points_in_polygon(
                        px[m][rest], py[m][rest], rings, kt
                    )
                out[m] = sub
            return pd.Series(out)

        udf_cond = F.col("ugid").isin(list(udf_polys)) & pip_many(
            F.col("ugid"), F.col(lon), F.col(lat),
            F.col("cell_y"), F.col("cell_x"),
        )
        cond = udf_cond if cond is None else (cond | udf_cond)

    return cand.filter(cond)


def _subset_many_boxes(
    spark: SparkSession,
    df: DataFrame,
    grid: GridSpec,
    polys: list[tuple[int, list[np.ndarray]]],
    keep_touches: bool,
) -> DataFrame:
    """Polygon-abstraction multi-geometry clip: per (row, ugid) the owning
    cell's box is intersected with that ugid's polygon; emits ``clip_area``.
    Rect polygons compile to closed-form overlap expressions chained per
    ugid; non-rect polygons share one Arrow UDF keyed by ugid. This is the
    canonical ocgis 'clip + aggregate per selection geometry' input
    (``ops/engine.py:287-385`` looped; here one plan)."""
    cov = _covering_many(spark, grid, polys)
    cand = df.join(
        F.broadcast(cov),
        (df["cell_y"] == cov["cov_y"]) & (df["cell_x"] == cov["cov_x"]),
        "inner",
    ).drop("cov_y", "cov_x")
    cand = cell_bounds(cand, grid)

    area_expr = None
    udf_polys = {}
    for ugid, rings in polys:
        rings = [np.asarray(r, dtype="f8") for r in rings]
        if _is_axis_rect(rings):
            minx, miny, maxx, maxy = _rings_bbox(rings)
            ox = F.least(F.col("lon_ub"), F.lit(maxx)) - F.greatest(
                F.col("lon_lb"), F.lit(minx)
            )
            oy = F.least(F.col("lat_ub"), F.lit(maxy)) - F.greatest(
                F.col("lat_lb"), F.lit(miny)
            )
            a = F.greatest(ox, F.lit(0.0)) * F.greatest(oy, F.lit(0.0))
            area_expr = (
                F.when(F.col("ugid") == ugid, a)
                if area_expr is None
                else area_expr.when(F.col("ugid") == ugid, a)
            )
        else:
            udf_polys[int(ugid)] = rings

    if udf_polys:
        kt_udf = keep_touches

        @F.pandas_udf("double")
        def clip_many(
            ugid_s: pd.Series, lon_lb: pd.Series, lat_lb: pd.Series,
            lon_ub: pd.Series, lat_ub: pd.Series,
        ) -> pd.Series:
            ug = ugid_s.to_numpy()
            out = np.full(len(ug), -1.0)
            for u, rings in udf_polys.items():
                m = ug == u
                if m.any():
                    keep, areas = G.boxes_intersect_polygon(
                        lon_lb.to_numpy("f8")[m], lat_lb.to_numpy("f8")[m],
                        lon_ub.to_numpy("f8")[m], lat_ub.to_numpy("f8")[m],
                        rings, keep_touches=kt_udf,
                    )
                    vals = np.where(keep, areas, -1.0)
                    out[m] = vals
            return pd.Series(out)

        udf_area = clip_many(
            F.col("ugid"), F.col("lon_lb"), F.col("lat_lb"),
            F.col("lon_ub"), F.col("lat_ub"),
        )
        area_expr = (
            udf_area if area_expr is None
            else area_expr.otherwise(udf_area)
        )
    out = cand.withColumn("clip_area", area_expr)
    if keep_touches:
        keep_cond = F.col("clip_area") >= 0.0
    else:
        keep_cond = F.col("clip_area") > G.EPS_AREA
    return out.filter(keep_cond)


def spatial_subset(
    spark: SparkSession,
    df: DataFrame,
    grid: GridSpec,
    rings: list[np.ndarray],
    operation: str = "intersects",
    abstraction: str = "point",
    keep_touches: bool | None = None,
    optimized_bbox: bool = False,
    allow_empty: bool = True,
    lon: str = "lon",
    lat: str = "lat",
    data_wrapped_state: str | None = None,
) -> DataFrame:
    """The top-level dispatcher (``spatial_subset.py:53-175`` analogue).

    ``operation``: 'intersects' (filter) or 'clip' (filter + clip_area).
    ``abstraction``: 'point' (row lon/lat vs polygon) or 'polygon' (owning
    cell box vs polygon). ``keep_touches`` default: point→True,
    polygon→False (``grid.py:627-631``).

    ``data_wrapped_state='unwrapped'``: the data uses 0..360 longitudes
    while the selection polygon is given in wrapped (-180..180] coords —
    the polygon is automatically unwrapped and, when it spans the unwrap
    seam, SPLIT into seam-free pieces whose results are combined
    (intersects: union+distinct; clip: per-row clip areas summed across
    pieces) — the reference's ``prepare_geometry_variable`` wiring
    (``crs.py:276-307``, ``spatial_subset.py:264-277``).
    """
    if keep_touches is None:
        keep_touches = abstraction == "point"

    if data_wrapped_state == "unwrapped":
        from . import crs as _crs

        pieces = _crs.unwrap_rings_pieces(rings)
        if len(pieces) == 1:
            rings = pieces[0]
        else:
            parts = [
                spatial_subset(
                    spark, df, grid, piece, operation, abstraction,
                    keep_touches, optimized_bbox, allow_empty=True,
                    lon=lon, lat=lat,
                )
                for piece in pieces
            ]
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
            if operation == "clip":
                # a cell straddling the seam appears once per piece with
                # partial areas that must SUM. NOTE: rows identical in
                # EVERY column collapse here (their areas merge) — the
                # seam path assumes corpus rows are distinct (they carry
                # doc/cell identity in every real schema); duplicates-by-
                # value would lose multiplicity (r4 review, documented)
                keys = [c for c in out.columns if c != "clip_area"]
                out = out.groupBy(*keys).agg(
                    F.sum("clip_area").alias("clip_area")
                )
            else:
                out = out.distinct()
            if not allow_empty and len(out.take(1)) == 0:
                raise ExtentError(
                    "spatial subset returned no rows (allow_empty=False)"
                )
            return out

    if optimized_bbox:
        return bbox_filter(df, _rings_bbox(rings), lon, lat, closed=keep_touches)
    if abstraction == "point" and len(rings) == 1 and G.ring_is_convex_ccw(
        np.asarray(rings[0], dtype="f8")
    ):
        # convex fast path: phase 1 is the polygon's envelope as plain range
        # predicates (the reference's buffered-envelope hint mask,
        # grid.py:1234-1272) — Catalyst pushes them to the scan; no
        # driver-side covering materialization, no broadcast exchange.
        cand = bbox_filter(df, _rings_bbox(rings), lon, lat, closed=True)
    elif (
        abstraction == "point"
        and not _is_axis_rect(rings)
        and operation != "clip"
    ):
        # general-ring point path: ONE covering semijoin (same plan shape
        # as before), but the covering's interior/boundary split ships
        # into the PIP UDF as a raster — interior-cell rows (the bulk at
        # fine grids) short-circuit to an O(1) lookup and only boundary
        # rows pay the O(segments) ray cast. Classification is
        # conservative (cellindex.covering_cells_split): identical rows.
        # estimate BEFORE enumerating (covering_cells_split meshgrids the
        # flat covering — the estimate is an upper bound, so the old
        # post-enumeration len check is subsumed; r4s10 review)
        if _flat_covering_estimate(grid, rings) > _COVERING_BROADCAST_CELLS:
            # degraded covering: bounded phase 1 + plain ray cast
            cand = coarse_filter(spark, df, grid, rings)
            out = refine_points(cand, rings, keep_touches, lon, lat)
        else:
            int_z, bnd_z = covering_cells_split(grid, rings)
            cand = _cell_semijoin(spark, df, np.concatenate([int_z, bnd_z]))
            icy, icx = zdecode(int_z)
            out = refine_points(
                cand, rings, keep_touches, lon, lat,
                interior=interior_raster(icy, icx),
            )
        if not allow_empty and len(out.take(1)) == 0:
            raise ExtentError(
                "spatial subset returned no rows (allow_empty=False)"
            )
        return out
    else:
        cand = coarse_filter(spark, df, grid, rings)
    if abstraction == "point":
        if operation == "clip":
            raise ValueError("clip requires polygon abstraction (cell boxes)")
        out = refine_points(cand, rings, keep_touches, lon, lat)
    else:
        out = refine_boxes(
            cand, grid, rings, keep_touches, with_area=(operation == "clip")
        )
    if not allow_empty and len(out.take(1)) == 0:
        raise ExtentError("spatial subset returned no rows (allow_empty=False)")
    return out
