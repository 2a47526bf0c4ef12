"""Non-uniform rectilinear grid operators (``VectorGridSpec``).

The reference's ``Grid`` wraps arbitrary coordinate variables with bounds
(``/root/reference/src/ocgis/spatial/grid.py:350-362``) and expands 1-D
coordinate vectors to the 2-D form on demand (``expand_grid``,
``grid.py:1287-1348``). Spark-first re-expression:

* **cell assignment** — Arrow pandas UDF running ``np.searchsorted`` over
  the broadcast edge vectors (O(log n) per point, vectorized per batch):
  the "width_bucket join" of SURVEY §2.3 without a join at all — a narrow
  map, zero shuffle, plan size independent of axis length (edges live in
  the captured closure, not in Catalyst literals);
* **cell bounds** — broadcast hash equijoin against tiny per-axis bounds
  tables (nx / ny rows), AQE-friendly at any axis length;
* **clip / intersects vs an axis-aligned rectangle** — the same closed-form
  ``greatest``/``least`` overlap arithmetic as the uniform grid, pure JVM;
* **general polygon subset** — phase 1 coarse covering from the polygon
  envelope's *index ranges* (two binary searches per axis, driver-side)
  exactly like the uniform ``covering_cells``; phase 2 reuses the grid-
  independent exact kernels (PIP on points / batch S–H on cell boxes).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..geo import geometry as G
from ..geo.cellindex import VectorGridSpec


def encode_cells(
    df: DataFrame,
    vg: VectorGridSpec,
    lon: str = "lon",
    lat: str = "lat",
    out_x: str = "vcx",
    out_y: str = "vcy",
) -> DataFrame:
    """Attach non-uniform cell indices via searchsorted (narrow map).
    Out-of-grid rows get -1 (callers filter)."""
    xb, yb = vg.xb(), vg.yb()
    nx, ny = vg.nx, vg.ny

    @F.pandas_udf("int")
    def cx_of(s: pd.Series) -> pd.Series:
        i = np.searchsorted(xb, s.to_numpy("f8"), side="right") - 1
        return pd.Series(np.where((i < 0) | (i >= nx), -1, i).astype("i4"))

    @F.pandas_udf("int")
    def cy_of(s: pd.Series) -> pd.Series:
        i = np.searchsorted(yb, s.to_numpy("f8"), side="right") - 1
        return pd.Series(np.where((i < 0) | (i >= ny), -1, i).astype("i4"))

    return df.withColumn(out_x, cx_of(F.col(lon))).withColumn(
        out_y, cy_of(F.col(lat))
    )


def bounds_tables(
    spark: SparkSession, vg: VectorGridSpec
) -> tuple[DataFrame, DataFrame]:
    """(x_bounds, y_bounds) DataFrames: (vcx, lon_lb, lon_ub) / (vcy,
    lat_lb, lat_ub). One Arrow block each; broadcast at join sites."""
    xb, yb = vg.xb(), vg.yb()
    bx = spark.createDataFrame(
        pd.DataFrame(
            {"vcx": np.arange(vg.nx, dtype="i4"), "lon_lb": xb[:-1], "lon_ub": xb[1:]}
        )
    )
    by = spark.createDataFrame(
        pd.DataFrame(
            {"vcy": np.arange(vg.ny, dtype="i4"), "lat_lb": yb[:-1], "lat_ub": yb[1:]}
        )
    )
    return bx, by


def with_cell_bounds(
    df: DataFrame, spark: SparkSession, vg: VectorGridSpec
) -> DataFrame:
    """Attach the owning cell's bounds via two broadcast equijoins."""
    bx, by = bounds_tables(spark, vg)
    return df.join(F.broadcast(bx), "vcx").join(F.broadcast(by), "vcy")


def clip_rect_cells(
    cells: DataFrame,
    spark: SparkSession,
    vg: VectorGridSpec,
    rect: tuple[float, float, float, float],
    keep_touches: bool = False,
) -> DataFrame:
    """Clip non-uniform cells by an axis-aligned rectangle: closed-form
    overlap area (pure JVM), strict-overlap keep unless ``keep_touches``."""
    minx, miny, maxx, maxy = rect
    b = with_cell_bounds(cells, spark, vg)
    ox = F.least(F.col("lon_ub"), F.lit(maxx)) - F.greatest(F.col("lon_lb"), F.lit(minx))
    oy = F.least(F.col("lat_ub"), F.lit(maxy)) - F.greatest(F.col("lat_lb"), F.lit(miny))
    area = F.greatest(ox, F.lit(0.0)) * F.greatest(oy, F.lit(0.0))
    out = b.withColumn("clip_area", area)
    if keep_touches:
        keep = (
            (F.col("lon_lb") <= maxx) & (F.col("lon_ub") >= minx)
            & (F.col("lat_lb") <= maxy) & (F.col("lat_ub") >= miny)
        )
    else:
        keep = F.col("clip_area") > G.EPS_AREA
    return out.filter(keep).drop("lon_lb", "lon_ub", "lat_lb", "lat_ub")


def covering_cells(
    vg: VectorGridSpec, rings: list[np.ndarray], refine: bool = True
) -> tuple[np.ndarray, np.ndarray]:
    """(cy, cx) arrays of cells whose box intersects the polygon — the
    driver-side phase-1 covering (uniform-grid ``covering_cells`` analogue,
    binary-search index ranges instead of floor arithmetic)."""
    rings = G.close_rings(rings)
    pts = np.vstack(rings)
    x0, x1, y0, y1 = vg.covering_index_ranges(
        float(pts[:, 0].min()), float(pts[:, 1].min()),
        float(pts[:, 0].max()), float(pts[:, 1].max()),
    )
    if x1 < x0 or y1 < y0:
        return np.empty(0, dtype="i8"), np.empty(0, dtype="i8")
    yy, xx = np.meshgrid(np.arange(y0, y1 + 1), np.arange(x0, x1 + 1), indexing="ij")
    cy, cx = yy.ravel(), xx.ravel()
    if refine and not G._rings_is_axis_rect(rings):
        bminx, bminy, bmaxx, bmaxy = vg.bounds(cy, cx)
        keep, _ = G.boxes_intersect_polygon(
            bminx, bminy, bmaxx, bmaxy, rings, keep_touches=True
        )
        cy, cx = cy[keep], cx[keep]
    return cy, cx


def covering_cells_split(
    vg: VectorGridSpec, rings: list[np.ndarray]
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(int_cy, int_cx, bnd_cy, bnd_cx): interior/boundary partition of the
    covering — the non-uniform twin of
    :func:`ocgis_spark.geo.cellindex.covering_cells_split` (conservative
    segment-bbox marking via 1-cell-dilated searchsorted index ranges,
    center ray-cast for the rest; no false interiors)."""
    rings = G.close_rings(rings)
    cy, cx = covering_cells(vg, rings)
    if len(cy) == 0:
        return cy, cx, cy, cx
    y0, y1 = int(cy.min()), int(cy.max())
    x0, x1 = int(cx.min()), int(cx.max())
    marked = np.zeros((y1 - y0 + 1, x1 - x0 + 1), dtype=bool)
    for ring in rings:
        r = np.asarray(ring, dtype="f8")
        for (ax, ay), (bx_, by_) in zip(r[:-1], r[1:]):
            ix0, ix1, iy0, iy1 = vg.covering_index_ranges(
                min(ax, bx_), min(ay, by_), max(ax, bx_), max(ay, by_)
            )
            ix0 = max(ix0 - 1, x0) - x0
            ix1 = min(ix1 + 1, x1) - x0
            iy0 = max(iy0 - 1, y0) - y0
            iy1 = min(iy1 + 1, y1) - y0
            if ix1 >= ix0 and iy1 >= iy0:
                marked[iy0:iy1 + 1, ix0:ix1 + 1] = True
    m = marked[cy - y0, cx - x0]
    bminx, bminy, bmaxx, bmaxy = vg.bounds(cy, cx)
    ccx = (bminx + bmaxx) / 2.0
    ccy = (bminy + bmaxy) / 2.0
    inside = np.zeros(len(cy), dtype=bool)
    if (~m).any():
        inside[~m] = G.points_in_polygon(
            ccx[~m], ccy[~m], [np.asarray(r, dtype="f8") for r in rings], True
        )
    interior = (~m) & inside
    return cy[interior], cx[interior], cy[~interior], cx[~interior]


def spatial_subset(
    spark: SparkSession,
    df: DataFrame,
    vg: VectorGridSpec,
    rings: list[np.ndarray],
    operation: str = "intersects",
    abstraction: str = "point",
    keep_touches: bool | None = None,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Two-phase subset on a non-uniform grid. Phase 2 reuses the grid-
    independent exact kernels; only phase 1 (covering) and the cell-bounds
    attachment differ from the uniform path."""
    from . import spatial as S

    if keep_touches is None:
        keep_touches = abstraction == "point"

    def semijoin(cy_, cx_):
        cov = spark.createDataFrame(
            pd.DataFrame({"vcy": cy_.astype("i4"), "vcx": cx_.astype("i4")})
        )
        return df.join(F.broadcast(cov), ["vcy", "vcx"], "leftsemi")

    if abstraction == "point":
        if operation == "clip":
            raise ValueError("clip requires polygon abstraction (cell boxes)")
        rings_f = [np.asarray(r, dtype="f8") for r in rings]
        general = not G._rings_is_axis_rect(rings_f) and not (
            len(rings_f) == 1 and G.ring_is_convex_ccw(rings_f[0])
        )
        if general:
            # general ring: one covering semijoin; the interior cells ship
            # into the PIP UDF as a raster so interior rows cost an O(1)
            # lookup and only boundary rows pay the O(segments) ray cast
            icy, icx, bcy, bcx = covering_cells_split(vg, rings)
            cand = semijoin(
                np.concatenate([icy, bcy]), np.concatenate([icx, bcx])
            )
            return S.refine_points(
                cand, rings, keep_touches, lon, lat,
                interior=S.interior_raster(icy, icx),
                cell_y="vcy", cell_x="vcx",
            )
        cy, cx = covering_cells(vg, rings)
        return S.refine_points(semijoin(cy, cx), rings, keep_touches, lon, lat)
    cy, cx = covering_cells(vg, rings)
    cand = semijoin(cy, cx)
    rings_bc = [np.asarray(r, dtype="f8") for r in rings]
    if G._rings_is_axis_rect(rings_bc):
        # rect fast path derives its own bounds join inside
        # clip_rect_cells — building it here too was dead plan work (r4)
        pts = np.vstack(rings_bc)
        rect = (
            float(pts[:, 0].min()), float(pts[:, 1].min()),
            float(pts[:, 0].max()), float(pts[:, 1].max()),
        )
        out = clip_rect_cells(cand, spark, vg, rect, keep_touches)
        return out if operation == "clip" else out.drop("clip_area")
    # polygon abstraction: attach per-cell bounds, then the shared batch
    # box-vs-polygon kernel
    b = with_cell_bounds(cand, spark, vg)
    kt = keep_touches

    @F.pandas_udf("double")
    def clip_area_udf(
        lon_lb: pd.Series, lat_lb: pd.Series, lon_ub: pd.Series, lat_ub: pd.Series
    ) -> pd.Series:
        keep, areas = G.boxes_intersect_polygon(
            lon_lb.to_numpy("f8"), lat_lb.to_numpy("f8"),
            lon_ub.to_numpy("f8"), lat_ub.to_numpy("f8"),
            rings_bc, keep_touches=kt,
        )
        return pd.Series(np.where(keep, areas, -1.0))

    out = b.withColumn(
        "clip_area",
        clip_area_udf(F.col("lon_lb"), F.col("lat_lb"), F.col("lon_ub"), F.col("lat_ub")),
    ).filter(F.col("clip_area") >= 0.0).drop("lon_lb", "lon_ub", "lat_lb", "lat_ub")
    return out if operation == "clip" else out.drop("clip_area")


# ---- curvilinear grids (2-D coordinate arrays) ----

def expand_edges(vg: VectorGridSpec) -> tuple[np.ndarray, np.ndarray]:
    """1-D edge vectors → 2-D corner arrays (ny+1, nx+1) — the reference's
    ``expand_grid`` (``src/ocgis/spatial/grid.py:1287-1348``), which turns
    vector coordinates into the curvilinear 2-D form."""
    X, Y = np.meshgrid(vg.xb(), vg.yb())
    return X, Y


def shear_grid(X: np.ndarray, Y: np.ndarray, k: float) -> tuple[np.ndarray, np.ndarray]:
    """Simple curvilinear deformation: shear lon by k·(lat - lat_min).
    Cells become parallelograms — enough to break every axis-aligned
    assumption while keeping analytic areas for tests."""
    return X + k * (Y - Y.min()), Y


def corner_table(spark: SparkSession, X: np.ndarray, Y: np.ndarray) -> DataFrame:
    """2-D corner arrays → SCRIP-style element corner table
    ``(elem_id, corner_lons, corner_lats)`` (corners CCW: ll, lr, ur, ul).
    Feed to ``geo.unstructured.corners_to_mesh`` — curvilinear subset/clip
    runs on the shared unstructured path (reference treats curvilinear
    cells as polygons the same way, ``grid.py:31-100``)."""
    ny, nx = X.shape[0] - 1, X.shape[1] - 1
    jj, ii = np.meshgrid(np.arange(ny), np.arange(nx), indexing="ij")
    jj, ii = jj.ravel(), ii.ravel()
    lons = np.stack(
        [X[jj, ii], X[jj, ii + 1], X[jj + 1, ii + 1], X[jj + 1, ii]], axis=1
    )
    lats = np.stack(
        [Y[jj, ii], Y[jj, ii + 1], Y[jj + 1, ii + 1], Y[jj + 1, ii]], axis=1
    )
    # Explicit schema + list cells: schema inference over numpy-array
    # cells only works when Arrow is enabled — a plain SparkSession falls
    # back to row-wise inference and raises CANNOT_INFER_TYPE_FOR_FIELD.
    pdf = pd.DataFrame(
        {
            "elem_id": (jj * nx + ii).astype("i8"),
            "corner_lons": [r.tolist() for r in lons],
            "corner_lats": [r.tolist() for r in lats],
        }
    )
    return spark.createDataFrame(
        pdf,
        schema="elem_id bigint, corner_lons array<double>, "
               "corner_lats array<double>",
    )


def curvilinear_subset(
    spark: SparkSession,
    X: np.ndarray,
    Y: np.ndarray,
    rings: list[np.ndarray],
    operation: str = "intersects",
    keep_touches: bool = False,
) -> DataFrame:
    """Subset/clip a curvilinear grid's cells by a polygon: corner table →
    node/connectivity mesh → two-phase unstructured subset."""
    from ..geo import unstructured as U

    corners = corner_table(spark, X, Y)
    elems, nodes = U.corners_to_mesh(corners)
    return U.subset_elements(
        elems, nodes, rings, keep_touches=keep_touches, operation=operation
    )


def spatial_subset_many(
    spark: SparkSession,
    df: DataFrame,
    vg: VectorGridSpec,
    polys: list,
    abstraction: str = "point",
    keep_touches: bool | None = None,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Multi-geometry subset on a NON-UNIFORM grid (the SpatialCollection
    analogue, mirroring ``spatial.spatial_subset_many``): one broadcast
    (ugid, vcy, vcx) covering for all polygons, then a single CASE-chained
    exact phase (rect/convex → Catalyst; general rings → one Arrow UDF).
    All ugids share one scan of the big side."""
    from . import spatial as S

    if keep_touches is None:
        keep_touches = abstraction == "point"
    ug_parts, cy_parts, cx_parts = [], [], []
    for ugid, rings in polys:
        cy, cx = covering_cells(vg, rings)
        ug_parts.append(np.full(len(cy), int(ugid), dtype="i4"))
        cy_parts.append(cy.astype("i4"))
        cx_parts.append(cx.astype("i4"))
    cov = spark.createDataFrame(
        pd.DataFrame({
            "ugid": np.concatenate(ug_parts),
            "vcy": np.concatenate(cy_parts),
            "vcx": np.concatenate(cx_parts),
        })
    )
    cand = df.join(
        F.broadcast(cov),
        (df["vcy"] == cov["vcy"]) & (df["vcx"] == cov["vcx"]),
        "inner",
    ).drop(cov["vcy"]).drop(cov["vcx"])
    if abstraction == "point":
        # the exact phase is grid-independent — reuse the uniform path's
        # CASE-chained predicate machinery by faking a per-ugid filter
        exprs = None
        udf_polys = {}
        for ugid, rings in polys:
            rings = [np.asarray(r, dtype="f8") for r in rings]
            if G._rings_is_axis_rect(rings):
                pts = np.vstack(rings)
                minx, miny = float(pts[:, 0].min()), float(pts[:, 1].min())
                maxx, maxy = float(pts[:, 0].max()), float(pts[:, 1].max())
                if keep_touches:
                    e = ((F.col(lon) >= minx) & (F.col(lon) <= maxx)
                         & (F.col(lat) >= miny) & (F.col(lat) <= maxy))
                else:
                    e = ((F.col(lon) > minx) & (F.col(lon) < maxx)
                         & (F.col(lat) > miny) & (F.col(lat) < maxy))
            elif len(rings) == 1 and G.ring_is_convex_ccw(rings[0]):
                from .spatial import convex_halfplane_cond

                e = convex_halfplane_cond(rings[0], lon, lat, keep_touches)
            else:
                udf_polys[int(ugid)] = rings
                continue
            c = (F.col("ugid") == int(ugid)) & e
            exprs = c if exprs is None else (exprs | c)
        if udf_polys:
            from . import spatial as S

            kt = keep_touches
            # per-ugid interior rasters (see spatial.spatial_subset_many):
            # interior-cell rows resolve via O(1) lookup in the UDF
            rasters = {}
            for u, rings_u in udf_polys.items():
                icy, icx, bcy, bcx = covering_cells_split(vg, rings_u)
                if len(icy) + len(bcy) <= 2_000_000:
                    ras = S.interior_raster(icy, icx)
                    if ras is not None:
                        rasters[u] = ras

            @F.pandas_udf("boolean")
            def pip_many(ugid_s: pd.Series, lon_s: pd.Series,
                         lat_s: pd.Series, cy_s: pd.Series,
                         cx_s: pd.Series) -> pd.Series:
                px, py = lon_s.to_numpy("f8"), lat_s.to_numpy("f8")
                cy_a, cx_a = cy_s.to_numpy("i8"), cx_s.to_numpy("i8")
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
                        ry = cy_a[m] - y0
                        rx = cx_a[m] - x0
                        inb = ((ry >= 0) & (ry < R.shape[0])
                               & (rx >= 0) & (rx < R.shape[1]))
                        sub[inb] = R[ry[inb], rx[inb]]
                    rest = ~sub
                    if rest.any():
                        sub[rest] = G.points_in_polygon(
                            px[m][rest], py[m][rest], rings, kt)
                    out[m] = sub
                return pd.Series(out)

            uc = F.col("ugid").isin(list(udf_polys)) & pip_many(
                F.col("ugid"), F.col(lon), F.col(lat),
                F.col("vcy"), F.col("vcx"))
            exprs = uc if exprs is None else (exprs | uc)
        return cand.filter(exprs)
    # polygon abstraction: bounds + per-ugid batch clip in one Arrow UDF
    b = with_cell_bounds(cand, spark, vg)
    udf_polys = {int(u): [np.asarray(r, "f8") for r in rs] for u, rs in polys}
    kt = keep_touches

    @F.pandas_udf("double")
    def clip_many(ugid_s: pd.Series, lon_lb: pd.Series, lat_lb: pd.Series,
                  lon_ub: pd.Series, lat_ub: pd.Series) -> pd.Series:
        ug = ugid_s.to_numpy()
        out = np.full(len(ug), -1.0)
        for u, rings in udf_polys.items():
            m = ug == u
            if m.any():
                keep, areas = G.boxes_intersect_polygon(
                    lon_lb.to_numpy("f8")[m], lat_lb.to_numpy("f8")[m],
                    lon_ub.to_numpy("f8")[m], lat_ub.to_numpy("f8")[m],
                    rings, keep_touches=kt,
                )
                out[m] = np.where(keep, areas, -1.0)
        return pd.Series(out)

    out = b.withColumn(
        "clip_area",
        clip_many(F.col("ugid"), F.col("lon_lb"), F.col("lat_lb"),
                  F.col("lon_ub"), F.col("lat_ub")),
    ).filter(F.col("clip_area") >= 0.0 if kt else F.col("clip_area") > G.EPS_AREA)
    return out.drop("lon_lb", "lon_ub", "lat_lb", "lat_ub")
