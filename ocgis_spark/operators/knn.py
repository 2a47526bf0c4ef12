"""kNN nearest-cell lookup (north rule), generalizing the reference's
``select_nearest`` top-1 (``/root/reference/src/ocgis/variable/geom.py:803-821``,
wired at ``ops/engine.py:152-155``).

Strategy (scale-first): ring expansion around the query point's cell —
Chebyshev-disk range predicates (Catalyst-pushable, no geometry) select
candidate cells; exact centroid distance + ``row_number`` pick the top k.
A disk of cell radius r is exhaustive once the k-th candidate distance is
≤ (r - 0.5)·res, because any excluded cell's centroid is at least that far
away — so the loop never scans the full grid for local queries.

Tie-break: (dist, cell_y, cell_x) ascending — the reference's argmin takes
the first hit in y-major array order.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..geo.cellindex import GridSpec
from ..session import local_df


def knn_join(
    points: DataFrame,
    cells: DataFrame,
    grid: GridSpec,
    k: int = 1,
    r0: int | None = None,
    qid: str = "qid",
    qlon: str = "qlon",
    qlat: str = "qlat",
    qcell_bounds: tuple[int, int, int, int] | None = None,
    eager: bool = False,
) -> DataFrame:
    """Batch kNN: k nearest cells for EVERY query point in one plan.

    Each point explodes to its Chebyshev disk of cell coordinates (pure
    ``sequence``/``explode`` arithmetic, no geometry), equi-joins the cell
    table on (cell_y, cell_x), then ``row_number`` picks the top k by exact
    centroid distance. Points whose k-th distance is not provably inside
    the disk (k-th dist > (r-0.5)·res, the same exhaustiveness bound as
    :func:`knn_cells`) are re-run with a doubled radius — the driver loop
    shrinks to the unsatisfied residue, so the common case is one pass.

    ``qcell_bounds`` (min_cx, min_cy, max_cx, max_cy): when the callers
    know the query points' cell-index envelope (single probe, clustered
    batch), the cell relation is RANGE-FILTERED to the r-buffered
    envelope BEFORE the distinct — the predicate reaches the scan
    (partition/row-group pruning on a cell-partitioned layout) and the
    distinct shuffles only disk-sized input instead of every distinct
    cell in the corpus. Results are identical: the disk equi-join keeps a
    subset of that envelope anyway.

    ``eager``: opt-in for SMALL point sets (single probe, driver-built
    batch). Each radius pass is collected (≤ k·n_points rows), the
    exhaustiveness bound is checked driver-side, and the final result is
    returned as a LOCAL relation — the caller's action then touches no
    cluster state. Collapses the 3-sequential-job floor (pass +
    exhaustiveness count + final materialize) to ONE job in the common
    single-pass case. Never use it when points is itself a large
    distributed relation.
    """
    if r0 is None:
        r0 = max(1, int(math.ceil(math.sqrt(k))))
    raw = cells.select("cell_y", "cell_x")
    # without an envelope, the distinct cell relation is tiny (bounded by
    # grid size) but derives from a full corpus scan — cache it so the
    # exhaustiveness check and the caller's final action reuse one scan
    shared = None if qcell_bounds is not None else raw.distinct().persist()

    def cells_for(r: int) -> DataFrame:
        if shared is not None:
            return shared
        cx0, cy0, cx1, cy1 = qcell_bounds
        return raw.filter(
            F.col("cell_x").between(cx0 - r, cx1 + r)
            & F.col("cell_y").between(cy0 - r, cy1 + r)
        ).distinct()
    lat_c = F.lit(grid.lat0) + (F.col("cell_y") + 0.5) * F.lit(grid.res)
    lon_c = F.lit(grid.lon0) + (F.col("cell_x") + 0.5) * F.lit(grid.res)

    def pass_at(pts: DataFrame, r: int) -> DataFrame:
        # CLAMP the anchor into the grid: the floor alone sends far-off-
        # grid probes to disks that never reach a real cell before the
        # max_r cap, silently returning EMPTY for a nearest-neighbor
        # query (the vector variant already clamps — r4 review finding)
        qcx = F.greatest(
            F.lit(0),
            F.least(
                F.lit(grid.nx - 1),
                F.floor(
                    (F.col(qlon) - F.lit(grid.lon0)) / F.lit(grid.res)
                ).cast("int"),
            ),
        )
        qcy = F.greatest(
            F.lit(0),
            F.least(
                F.lit(grid.ny - 1),
                F.floor(
                    (F.col(qlat) - F.lit(grid.lat0)) / F.lit(grid.res)
                ).cast("int"),
            ),
        )
        disk = (
            pts.withColumn("_qcx", qcx)
            .withColumn("_qcy", qcy)
            .withColumn(
                "cell_y",
                F.explode(F.sequence(F.col("_qcy") - r, F.col("_qcy") + r)),
            )
            .withColumn(
                "cell_x",
                F.explode(F.sequence(F.col("_qcx") - r, F.col("_qcx") + r)),
            )
        )
        # the exploded disk (n_points × (2r+1)² rows) is the small side —
        # broadcast it so the corpus-derived cells relation never shuffles
        joined = cells_for(r).join(
            F.broadcast(disk), ["cell_y", "cell_x"], "inner"
        )
        dist = F.sqrt(
            (lon_c - F.col(qlon)) * (lon_c - F.col(qlon))
            + (lat_c - F.col(qlat)) * (lat_c - F.col(qlat))
        )
        w = Window.partitionBy(qid).orderBy("dist", "cell_y", "cell_x")
        return (
            joined.withColumn("dist", dist)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .drop("_qcx", "_qcy")
        )

    # Expansion loop kept FLAT: on any unsatisfied point the whole pass is
    # re-run at the doubled radius (iteratively unioning per-point retries
    # would nest windows/joins into an exponentially growing plan). The
    # common case is a single pass; retries are rare and the disk explode
    # is cheap arithmetic.
    r = r0
    max_r = 2 * max(grid.nx, grid.ny)  # query points may lie off-grid
    sel_cols = [qid, "cell_y", "cell_x", "dist", "rank"]
    if eager:
        qids = [row[0] for row in points.select(qid).collect()]
        while True:
            sel = pass_at(points, r).select(*sel_cols)
            rows = sel.collect()
            if r >= max_r:
                break
            per: dict = {}
            for row in rows:
                n, kth = per.get(row[0], (0, 0.0))
                per[row[0]] = (n + 1, max(kth, row[3]))
            bound = (r - 0.5) * grid.res

            def _ok(q):
                n, kth = per.get(q, (0, float("inf")))
                return n >= k and kth <= bound

            if all(_ok(q) for q in qids):
                break
            r *= 2
        if shared is not None:
            shared.unpersist()
        return local_df(points.sparkSession, rows, sel.schema)
    prev = None
    while True:
        # persist the pass: the exhaustiveness count below fully computes
        # it, and the caller's action then reads k·n_points cached rows
        # instead of recomputing the join+window
        result = pass_at(points, r).persist()
        if prev is not None:
            prev.unpersist()
        prev = result
        if r >= max_r:
            break
        kth = result.groupBy(qid).agg(
            F.count(F.lit(1)).alias("n"), F.max("dist").alias("kth")
        )
        # left join from the FULL point set: a point with zero hits has no
        # stats row at all and must still be retried
        stats = points.select(qid).join(F.broadcast(kth), qid, "left")
        n_bad = stats.filter(
            F.col("n").isNull()
            | (F.col("n") < k)
            | (F.col("kth") > (r - 0.5) * grid.res)
        ).count()
        if n_bad == 0:
            break
        r *= 2
    # materialize the final pass (no-op when the exhaustiveness count
    # already did), then release the cells cache — repeated calls in a
    # long session must not accumulate cached relations (ADVICE r2).
    # Callers should unpersist the returned result when done with it.
    result.count()
    if shared is not None:
        shared.unpersist()
    return result.select(qid, "cell_y", "cell_x", "dist", "rank")


def knn_join_vector(
    points: DataFrame,
    cells: DataFrame,
    vg,
    k: int = 1,
    r0: int | None = None,
    qid: str = "qid",
    qlon: str = "qlon",
    qlat: str = "qlat",
    qcell_bounds: tuple[int, int, int, int] | None = None,
    eager: bool = False,
) -> DataFrame:
    """Batch kNN on a NON-UNIFORM (VectorGridSpec) grid: the same
    index-disk expansion as :func:`knn_join`, with

    * query cell indices via searchsorted (Arrow, narrow);
    * exact centroid distances from the broadcast per-axis bounds tables;
    * the exhaustiveness bound using the MINIMUM cell width: a cell whose
      Chebyshev index distance exceeds r lies at least (r − 0.5)·w_min
      away, so once the k-th distance is within that, the disk is provably
      exhaustive even on a stretched axis;
    * ``qcell_bounds`` (min_cx, min_cy, max_cx, max_cy): known probe
      envelope → the cell relation is range-filtered to the r-buffered
      envelope before the distinct (scan pruning), as in :func:`knn_join`;
    * ``eager``: small-point-set fast path — collect each pass, verify
      the bound driver-side, return a local relation (one Spark job in
      the common case; see :func:`knn_join`).
    """
    import math as _math

    import numpy as np

    from . import vectorgrid as VG

    if r0 is None:
        r0 = max(1, int(_math.ceil(_math.sqrt(k))))
    w_min = float(min(np.diff(vg.xb()).min(), np.diff(vg.yb()).min()))
    spark = points.sparkSession
    raw = cells.select(
        F.col("vcy").alias("cell_y"), F.col("vcx").alias("cell_x")
    )
    shared = None if qcell_bounds is not None else raw.distinct().persist()

    def cells_for(r: int) -> DataFrame:
        if shared is not None:
            return shared
        cx0, cy0, cx1, cy1 = qcell_bounds
        return raw.filter(
            F.col("cell_x").between(cx0 - r, cx1 + r)
            & F.col("cell_y").between(cy0 - r, cy1 + r)
        ).distinct()
    bx, by = VG.bounds_tables(spark, vg)
    pts = VG.encode_cells(points, vg, lon=qlon, lat=qlat,
                          out_x="_qcx", out_y="_qcy")
    # Off-grid probes encode to -1 (cell_of clamps BOTH out-of-range sides
    # to the sentinel), which would anchor the expansion disk at the wrong
    # corner and force ~log2(2·max(nx,ny)) full fallback passes (ADVICE
    # r2). Clamp to the nearest valid index per axis instead — the uniform
    # grid's floor arithmetic does this implicitly.
    xb_arr, yb_arr = vg.xb(), vg.yb()
    pts = pts.withColumn(
        "_qcx",
        F.when(F.col(qlon) >= F.lit(float(xb_arr[-1])), F.lit(vg.nx - 1))
        .when(F.col(qlon) < F.lit(float(xb_arr[0])), F.lit(0))
        .otherwise(F.col("_qcx")).cast("int"),
    ).withColumn(
        "_qcy",
        F.when(F.col(qlat) >= F.lit(float(yb_arr[-1])), F.lit(vg.ny - 1))
        .when(F.col(qlat) < F.lit(float(yb_arr[0])), F.lit(0))
        .otherwise(F.col("_qcy")).cast("int"),
    )

    def pass_at(r: int) -> DataFrame:
        disk = (
            pts.withColumn(
                "cell_y", F.explode(F.sequence(F.col("_qcy") - r, F.col("_qcy") + r))
            )
            .withColumn(
                "cell_x", F.explode(F.sequence(F.col("_qcx") - r, F.col("_qcx") + r))
            )
        )
        joined = cells_for(r).join(
            F.broadcast(disk), ["cell_y", "cell_x"], "inner"
        )
        joined = (
            joined.join(F.broadcast(bx), joined["cell_x"] == bx["vcx"])
            .join(F.broadcast(by), joined["cell_y"] == by["vcy"])
        )
        lon_c = (F.col("lon_lb") + F.col("lon_ub")) / 2.0
        lat_c = (F.col("lat_lb") + F.col("lat_ub")) / 2.0
        dist = F.sqrt(
            (lon_c - F.col(qlon)) * (lon_c - F.col(qlon))
            + (lat_c - F.col(qlat)) * (lat_c - F.col(qlat))
        )
        w = Window.partitionBy(qid).orderBy("dist", "cell_y", "cell_x")
        return (
            joined.withColumn("dist", dist)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
        )

    r = r0
    max_r = 2 * max(vg.nx, vg.ny)
    sel_cols = [qid, "cell_y", "cell_x", "dist", "rank"]
    if eager:
        qids = [row[0] for row in points.select(qid).collect()]
        while True:
            sel = pass_at(r).select(*sel_cols)
            rows = sel.collect()
            if r >= max_r:
                break
            per: dict = {}
            for row in rows:
                n, kth = per.get(row[0], (0, 0.0))
                per[row[0]] = (n + 1, max(kth, row[3]))
            bound = (r - 0.5) * w_min

            def _ok(q):
                n, kth = per.get(q, (0, float("inf")))
                return n >= k and kth <= bound

            if all(_ok(q) for q in qids):
                break
            r *= 2
        if shared is not None:
            shared.unpersist()
        return local_df(spark, rows, sel.schema).select(
            qid, F.col("cell_y").alias("vcy"), F.col("cell_x").alias("vcx"),
            "dist", "rank",
        )
    prev = None
    while True:
        result = pass_at(r).persist()
        if prev is not None:
            prev.unpersist()
        prev = result
        if r >= max_r:
            break
        kth = result.groupBy(qid).agg(
            F.count(F.lit(1)).alias("n"), F.max("dist").alias("kth")
        )
        stats = points.select(qid).join(F.broadcast(kth), qid, "left")
        n_bad = stats.filter(
            F.col("n").isNull()
            | (F.col("n") < k)
            | (F.col("kth") > (r - 0.5) * w_min)
        ).count()
        if n_bad == 0:
            break
        r *= 2
    result.count()
    if shared is not None:
        shared.unpersist()
    return result.select(
        qid, F.col("cell_y").alias("vcy"), F.col("cell_x").alias("vcx"),
        "dist", "rank",
    )


def knn_cells(
    df: DataFrame,
    grid: GridSpec,
    qlon: float,
    qlat: float,
    k: int = 1,
    cell_y: str = "cell_y",
    cell_x: str = "cell_x",
) -> DataFrame:
    """k nearest distinct cells (by centroid distance) to (qlon, qlat)
    among the cells present in ``df``. Returns
    ``cell_y, cell_x, dist, rank`` ordered by (dist, cell_y, cell_x).

    Thin wrapper over the batch :func:`knn_join` with a single query row —
    one distributed plan end to end. (The first implementation drove a
    collect-per-iteration loop from the driver: a full Spark job per ring
    expansion, seconds of latency per probe on a shared cluster.)"""
    spark = df.sparkSession
    pts = local_df(
        spark, [(0, float(qlon), float(qlat))],
        "qid int, qlon double, qlat double",
    )
    cells = df.select(
        F.col(cell_y).alias("cell_y"), F.col(cell_x).alias("cell_x")
    )
    # single probe: the query cell is known driver-side, so hand knn_join
    # the 1-cell envelope — the cell relation is range-filtered (scan
    # predicate) instead of fully distinct-ed
    # clamp into the grid (same reason as the batch anchor above): an
    # off-grid probe's raw floor cell makes the 1-cell envelope filter
    # exclude every real cell -> silent empty result (r4 review)
    qcx = min(max(int(math.floor((qlon - grid.lon0) / grid.res)), 0),
              grid.nx - 1)
    qcy = min(max(int(math.floor((qlat - grid.lat0) / grid.res)), 0),
              grid.ny - 1)
    out = knn_join(pts, cells, grid, k=k,
                   qcell_bounds=(qcx, qcy, qcx, qcy), eager=True)
    return out.select(
        F.col("cell_y").alias(cell_y), F.col("cell_x").alias(cell_x),
        "dist", "rank",
    )


def _disk_windows(
    queries: list[tuple[int, float, float]], radius_m: float
) -> list[tuple]:
    """(qid, q_lon, q_lat, lat_lo, lat_hi, lon_lo, lon_hi) rows whose
    union CONTAINS each query's geodesic disk: Δlat is the meridian arc,
    Δlon is widened by 1/cos at the disk's FAR latitude, ±180°-crossing
    windows split into two intervals. The keep decision downstream is
    round(dist, 3) <= radius_m — true distance up to radius_m + 0.5 mm —
    so the window is computed for radius_m + 1 mm: a boundary point just
    past the tangent-tight window can never be kept by the no-window
    oracle yet dropped by phase 1 (r4s14 review finding). Property-tested
    (hypothesis) for containment over random lat/radius/bearing."""
    from .crs import R_SPHERE

    r_win = float(radius_m) + 1e-3
    rows = []
    for qi, qlon, qlat in queries:
        dlat = math.degrees(r_win / R_SPHERE)
        far = min(89.9999, abs(qlat) + dlat)
        dlon = math.degrees(
            r_win / (R_SPHERE * max(math.cos(math.radians(far)), 1e-9))
        )
        lon_lo, lon_hi = qlon - dlon, qlon + dlon
        if dlon >= 180.0:
            ivals = [(-180.0, 180.0)]
        elif lon_lo < -180.0:
            ivals = [(-180.0, lon_hi), (lon_lo + 360.0, 180.0)]
        elif lon_hi > 180.0:
            ivals = [(lon_lo, 180.0), (-180.0, lon_hi - 360.0)]
        else:
            ivals = [(lon_lo, lon_hi)]
        for lo, hi in ivals:
            rows.append((int(qi), float(qlon), float(qlat),
                         float(qlat - dlat), float(qlat + dlat),
                         float(lo), float(hi)))
    return rows


def radius_join(
    df: DataFrame,
    queries: list[tuple[int, float, float]],
    radius_m: float,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Within-distance GEODESIC join (the reference's planar
    ``select_nearest`` family has no radius form; this is the
    within-R-meters subset every point-based service needs): every
    (query, row) pair whose great-circle distance — reference Spherical
    radius, ``crs.haversine_m_sql`` — is ≤ ``radius_m``.

    Two phases, same posture as the polygon subsets:

    * phase 1: per-query lat/lon windows bounding the R-meter disk
      (Δlat = R/R_sphere; Δlon widened by 1/cos at the disk's far
      latitude, so the window always CONTAINS the disk — over-covering
      is corrected by phase 2). Windows crossing ±180° split into two
      intervals. The OR of all windows is a scan-pushable prefilter;
      the per-pair containment then runs on a BROADCAST interval table
      (≤ 2 rows per query) — the corpus is never shuffled.
    * phase 2: exact haversine as ONE dialect-shared Catalyst
      expression, compared on round(·, 3) meters (millimeters; libm
      drift is ~1e-9 relative) so both engines make identical keep
      decisions.

    Returns (qid, <df columns...>, dist_m). Driver-side work is O(#queries).
    """
    from .crs import haversine_m_sql

    spark = df.sparkSession
    rows = _disk_windows(queries, radius_m)
    win = local_df(
        spark, rows,
        "qid int, q_lon double, q_lat double, lat_lo double, "
        "lat_hi double, lon_lo double, lon_hi double",
    )
    # phase-1 global prefilter (reaches the scan as an OR of ranges)
    pre = F.lit(False)
    for _, _, _, la0, la1, lo0, lo1 in rows:
        pre = pre | (
            F.col(lat).between(la0, la1) & F.col(lon).between(lo0, lo1)
        )
    cand = df.filter(pre).join(
        F.broadcast(win),
        F.col(lat).between(F.col("lat_lo"), F.col("lat_hi"))
        & F.col(lon).between(F.col("lon_lo"), F.col("lon_hi")),
    )
    dist = F.expr(haversine_m_sql(lon, lat, "q_lon", "q_lat"))
    return (
        cand.withColumn("dist_m", F.round(dist, 3))
        .filter(F.col("dist_m") <= F.lit(float(radius_m)))
        .drop("q_lon", "q_lat", "lat_lo", "lat_hi", "lon_lo", "lon_hi")
    )


def radius_join_sql(
    src_sql: str,
    queries: list[tuple[int, float, float]],
    radius_m: float,
    lon: str = "lon",
    lat: str = "lat",
    cols: str = "doc_id",
) -> str:
    """Oracle twin of :func:`radius_join` — the truth computed DIRECTLY
    (cross join × exact haversine on the same rounded comparison, NO
    phase-1 window), so a phase-1 bug that drops legitimate rows fails
    the parity check instead of hiding in a shared approximation."""
    from ..fixtures import _f
    from .crs import haversine_m_sql

    vals = ", ".join(
        f"({int(qi)}, CAST({_f(qlon)} AS DOUBLE), "
        f"CAST({_f(qlat)} AS DOUBLE))"
        for qi, qlon, qlat in queries
    )
    hav = haversine_m_sql(lon, lat, "q_lon", "q_lat")
    return (
        f"WITH src AS ({src_sql}), "
        f"q(qid, q_lon, q_lat) AS (VALUES {vals}) "
        f"SELECT q.qid, {cols}, round({hav}, 3) AS dist_m "
        f"FROM src CROSS JOIN q "
        f"WHERE round({hav}, 3) <= {_f(float(radius_m))}"
    )


def knn_geodesic(
    df: DataFrame,
    queries: list[tuple[int, float, float]],
    k: int,
    lon: str = "lon",
    lat: str = "lat",
    id_col: str = "doc_id",
    r0_m: float = 50000.0,
) -> DataFrame:
    """Geodesic top-k nearest rows per query point (the great-circle
    sibling of :func:`knn_join`'s planar ring expansion): per-query
    candidates from :func:`radius_join` disks, exact haversine ranking,
    radius ×4 per round for queries whose k-th hit is not yet PROVABLY
    inside the disk (the phase-1 window CONTAINS the radius-r disk, so
    ``n == k and kth <= r`` certifies exhaustiveness — any excluded row
    is farther than r). The radius is capped at half the circumference:
    that sweep sees every row, so queries with fewer than k rows in the
    whole input terminate with what exists.

    Ties break on (dist_m, id_col) with dist_m ROUNDED to millimeters
    first — both engines rank identical values, so cross-engine libm
    drift cannot flip a near-tie (the dsir_sample rounding contract).

    EAGER: each round's top-k (≤ k · |pending| rows — bounded by
    construction) is collected ONCE and both the exhaustiveness stats
    and the final result come from those rows, so every round's corpus
    plan executes exactly once (the same bounded-driver-materialization
    posture as knn_join's eager single-probe path; a lazy union would
    re-run every round's radius_join when the caller acts — r4s14
    review finding). Project ``df`` down to the needed columns first if
    rows are wide. Rounds are O(log(r_final/r0)). Returns
    (qid, <df columns...>, dist_m, rank) rebuilt with an explicit
    schema (the repo's no-arrow conversion rule).
    """
    from .crs import R_SPHERE

    if k < 1:
        raise ValueError(f"knn_geodesic: k must be >= 1, got {k}")
    if not queries:
        raise ValueError("knn_geodesic: queries must be non-empty")
    if not float(r0_m) > 0.0:
        raise ValueError(f"knn_geodesic: r0_m must be > 0, got {r0_m}")
    half_circ = math.pi * R_SPHERE
    pending = [(int(q[0]), float(q[1]), float(q[2])) for q in queries]
    r = min(float(r0_m), half_circ)
    out_rows: list = []
    schema = None
    while pending:
        cand = radius_join(df, pending, r, lon=lon, lat=lat)
        w = Window.partitionBy("qid").orderBy("dist_m", id_col)
        top = (
            cand.withColumn("rank", F.row_number().over(w).cast("int"))
            .filter(F.col("rank") <= k)
        )
        schema = top.schema
        got = top.collect()
        by_q: dict = {}
        for row in got:
            by_q.setdefault(row["qid"], []).append(row)
        full_sweep = r >= half_circ
        done = {
            qi for qi, _, _ in pending
            if full_sweep
            or (
                len(by_q.get(qi, ())) == k
                and max(x["dist_m"] for x in by_q[qi]) <= r
            )
        }
        for qi in sorted(done):
            out_rows.extend(by_q.get(qi, ()))
        pending = [q for q in pending if q[0] not in done]
        r = min(r * 4.0, half_circ)
    return df.sparkSession.createDataFrame(out_rows, schema)
