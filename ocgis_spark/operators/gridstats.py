"""Focal (neighborhood) statistics on the seam-wrapped cell lattice.

The reference's spatial machinery subsets and aggregates grids; it has
no inferential neighborhood statistics. This module adds the two focal
operators a geospatial event pipeline serves on top of the same
graticule the cluster family uses (`cluster.cell_id_sql`):

* :func:`getis_ord_gi` — Getis-Ord Gi* hotspot z-scores (Getis & Ord
  1992; the ArcGIS "Hot Spot Analysis" statistic) with binary 3x3
  weights over a FIXED study lattice (missing cells count as zero, as
  the statistic requires — dropping empty cells silently inflates the
  global mean).
* :func:`kde_cells` — Gaussian kernel smoothing of cell counts with
  FIXED-POINT integer weights, so the scatter-sum is exact integer
  arithmetic and immune to double summation order (the usual
  sum(double) parity trap).

Scale posture (both): ONE corpus aggregation (map-side partial counts)
down to the cell table, bounded by the graticule — every subsequent
explode/join/aggregate runs on cells, never on the corpus. The 3x3 (or
kernel-disk) scatter is a bounded Generate over that cell table; the
1-row global-moment join broadcasts. Longitude cells WRAP modulo nx
(antimeridian hotspots connect); latitude clips at the study bounds.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .cluster import _grid_params, cell_id_sql
from .crs import _pf


def _lat_band(cell_deg: float, lat0: float, lat1: float) -> tuple:
    """(cy0, cy1) for a study band [lat0, lat1); both bounds must sit on
    cell edges so the lattice size n is well-defined."""
    for name, v in (("lat0", lat0), ("lat1", lat1)):
        k = v / cell_deg
        if abs(k - round(k)) > 1e-9:
            raise ValueError(
                f"{name}={v} is not a multiple of cell_deg={cell_deg}"
            )
    if not -90.0 <= lat0 < lat1 <= 90.0:
        raise ValueError(f"need -90 <= lat0 < lat1 <= 90, got {lat0},{lat1}")
    return int(round(lat0 / cell_deg)), int(round(lat1 / cell_deg))


def _check_window_nx(nx: int, reach: int) -> None:
    """The wrapped lon scatter hits each neighbor cell ONCE only while
    the offset residues -reach..reach are distinct mod nx, i.e.
    nx >= 2*reach + 1. Below that a source cell scatters twice into the
    same target and window sums silently double-count (parity would
    still hold — both dialects share the SQL — so fail loudly here,
    exactly like the colocation cover check)."""
    if nx < 2 * reach + 1:
        raise ValueError(
            f"window reach {reach} needs nx >= {2 * reach + 1} lon "
            f"cells for a collision-free wrap; got nx={nx} — "
            f"shrink cell_deg"
        )


def _counts_sql(
    src_sql: str, cell_deg: float, cy0: int, cy1: int, lon: str, lat: str
) -> str:
    """Per-cell BIGINT counts over the study band (dialect-neutral)."""
    _, cx, cy = cell_id_sql(cell_deg, lon, lat)
    return (
        f"SELECT {cx} AS cx, {cy} AS cy, "
        f"CAST(count(*) AS BIGINT) AS cnt FROM ({src_sql}) s "
        f"WHERE {cy} >= {cy0} AND {cy} < {cy1} "
        f"GROUP BY 1, 2"
    )


# ---------------------------------------------------------------- Gi* --

def getis_ord_gi_sql(
    src_sql: str,
    cell_deg: float,
    lat0: float,
    lat1: float,
    lon: str = "lon",
    lat: str = "lat",
) -> str:
    """One dialect-neutral SQL string computing Gi* per cell — shared by
    the Spark query and the DuckDB oracle, so both engines evaluate the
    identical expression tree (the geodesic-family parity posture).

    Statistic (binary weights w_ij in {0,1} over the 3x3 window
    INCLUDING self, x_j = event count of lattice cell j, n = nx*ny study
    cells, empty cells x=0):

        Gi* = (S_i - xbar*W_i) / (s * sqrt((n*W_i - W_i^2) / (n-1)))

    with S_i the window sum, W_i the window size (9 in the interior,
    lat-edge rows clipped; longitude wraps so there is no lon edge),
    xbar = SUM(x)/n and s = sqrt(SUM(x^2)/n - xbar^2) the population
    moments. SUM(x)/SUM(x^2) stay exact BIGINTs until the final double
    arithmetic, so the result is order-independent; the single z value
    is round(.,6) per the aggregation-float convention.

    Output: cells whose 3x3 window holds at least one event (an
    all-empty window's z is the same negative constant per W — noise).
    Columns (cell_x, cell_y, nbr_sum, w_size, gi_z).
    """
    nx, _, _ = _grid_params(cell_deg)
    _check_window_nx(nx, 1)
    cy0, cy1 = _lat_band(cell_deg, lat0, lat1)
    n_cells = nx * (cy1 - cy0)
    if n_cells < 2:
        raise ValueError("study lattice needs at least 2 cells")
    offs = ", ".join(
        f"({dx}, {dy})" for dx in (-1, 0, 1) for dy in (-1, 0, 1)
    )
    counts = _counts_sql(src_sql, cell_deg, cy0, cy1, lon, lat)
    n = f"{n_cells}.0E0"
    return (
        f"WITH counts AS ({counts}), "
        f"gmom AS (SELECT CAST(sum(cnt) AS BIGINT) AS sx, "
        f"CAST(sum(cnt * cnt) AS BIGINT) AS sxx FROM counts), "
        f"offs(dx, dy) AS (VALUES {offs}), "
        f"scat AS (SELECT ((c.cx + o.dx + {nx}) % {nx}) AS tx, "
        f"(c.cy + o.dy) AS ty, c.cnt "
        f"FROM counts c CROSS JOIN offs o "
        f"WHERE (c.cy + o.dy) >= {cy0} AND (c.cy + o.dy) < {cy1}), "
        f"win AS (SELECT tx, ty, CAST(sum(cnt) AS BIGINT) AS nbr_sum "
        f"FROM scat GROUP BY tx, ty), "
        f"sized AS (SELECT tx, ty, nbr_sum, "
        f"3 * (1 + (CASE WHEN ty - 1 >= {cy0} THEN 1 ELSE 0 END) "
        f"+ (CASE WHEN ty + 1 < {cy1} THEN 1 ELSE 0 END)) AS w_size "
        f"FROM win) "
        f"SELECT tx AS cell_x, ty AS cell_y, nbr_sum, "
        f"CAST(w_size AS BIGINT) AS w_size, "
        f"round((CAST(nbr_sum AS DOUBLE) "
        f"- (CAST(sx AS DOUBLE) / {n}) * CAST(w_size AS DOUBLE)) "
        f"/ nullif(sqrt(CAST(sxx AS DOUBLE) / {n} "
        f"- (CAST(sx AS DOUBLE) / {n}) * (CAST(sx AS DOUBLE) / {n})) "
        f"* sqrt(({n} * CAST(w_size AS DOUBLE) "
        f"- CAST(w_size AS DOUBLE) * CAST(w_size AS DOUBLE)) "
        f"/ ({n} - 1.0E0)), 0.0E0), 6) AS gi_z "
        f"FROM sized CROSS JOIN gmom"
    )


def getis_ord_gi(
    df: DataFrame,
    cell_deg: float,
    lat0: float,
    lat1: float,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Gi* hotspot z-scores per lattice cell (see :func:`getis_ord_gi_sql`
    for the statistic). DataFrame plan: one corpus hash-aggregate down to
    the cell table, a bounded 9-offset Generate + cell aggregate, and a
    broadcast 1-row global-moment join — the corpus is scanned exactly
    once and never shuffled beyond the first partial-aggregated exchange.
    """
    nx, _, _ = _grid_params(cell_deg)
    _check_window_nx(nx, 1)
    cy0, cy1 = _lat_band(cell_deg, lat0, lat1)
    n_cells = nx * (cy1 - cy0)
    if n_cells < 2:
        raise ValueError("study lattice needs at least 2 cells")
    _, cx, cy = cell_id_sql(cell_deg, lon, lat)
    counts = (
        df.selectExpr(f"{cx} AS cx", f"{cy} AS cy")
        .filter(f"cy >= {cy0} AND cy < {cy1}")
        .groupBy("cx", "cy")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    glob = counts.agg(
        F.sum("cnt").cast("bigint").alias("sx"),
        F.sum(F.col("cnt") * F.col("cnt")).cast("bigint").alias("sxx"),
    )
    offs = ", ".join(
        f"struct({dx} AS dx, {dy} AS dy)"
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)
    )
    scat = counts.selectExpr(
        f"explode(array({offs})) AS o", "cx", "cy", "cnt"
    ).selectExpr(
        f"((cx + o.dx + {nx}) % {nx}) AS tx", "(cy + o.dy) AS ty", "cnt"
    ).filter(f"ty >= {cy0} AND ty < {cy1}")
    # w_size is a NAMED column (evaluated once); the z expression below
    # references it — same expression tree as the `sized` CTE in the
    # SQL twin, so values agree exactly
    sized = scat.groupBy("tx", "ty").agg(
        F.sum("cnt").cast("bigint").alias("nbr_sum")
    ).selectExpr(
        "tx", "ty", "nbr_sum",
        f"CAST(3 * (1 + (CASE WHEN ty - 1 >= {cy0} THEN 1 ELSE 0 END) "
        f"+ (CASE WHEN ty + 1 < {cy1} THEN 1 ELSE 0 END)) AS BIGINT) "
        f"AS w_size",
    )
    n = f"{n_cells}.0E0"
    return sized.crossJoin(F.broadcast(glob)).selectExpr(
        "tx AS cell_x",
        "ty AS cell_y",
        "nbr_sum",
        "w_size",
        f"round((CAST(nbr_sum AS DOUBLE) "
        f"- (CAST(sx AS DOUBLE) / {n}) * CAST(w_size AS DOUBLE)) "
        f"/ nullif(sqrt(CAST(sxx AS DOUBLE) / {n} "
        f"- (CAST(sx AS DOUBLE) / {n}) * (CAST(sx AS DOUBLE) / {n})) "
        f"* sqrt(({n} * CAST(w_size AS DOUBLE) "
        f"- CAST(w_size AS DOUBLE) * CAST(w_size AS DOUBLE)) "
        f"/ ({n} - 1.0E0)), 0.0E0), 6) AS gi_z",
    )


# ---------------------------------------------------------------- KDE --

#: fixed-point weight scale: 1e6 keeps per-target sums inside BIGINT up
#: to ~9e12 events under one kernel disk (scale * disk_size * max_cnt)
_KDE_SCALE = 1_000_000


def kernel_offsets(sigma_cells: float, radius_cells: int) -> list:
    """(dx, dy, w_int) for the Euclidean kernel disk dx^2+dy^2 <= r^2.
    Weights are Gaussian exp(-d^2 / (2 sigma^2)) scaled to integers at
    :data:`_KDE_SCALE` — computed ONCE in Python, folded into both
    dialects as identical literals, so the scatter-sum is exact integer
    arithmetic (no double summation order anywhere)."""
    if not sigma_cells > 0:
        raise ValueError(f"sigma_cells must be positive, got {sigma_cells}")
    if not 1 <= radius_cells <= 8:
        raise ValueError(
            f"radius_cells must be in [1, 8] (disk <= 289 offsets), "
            f"got {radius_cells}"
        )
    out = []
    r2 = radius_cells * radius_cells
    for dx in range(-radius_cells, radius_cells + 1):
        for dy in range(-radius_cells, radius_cells + 1):
            d2 = dx * dx + dy * dy
            if d2 > r2:
                continue
            w = int(round(
                math.exp(-d2 / (2.0 * sigma_cells * sigma_cells))
                * _KDE_SCALE
            ))
            if w > 0:
                out.append((dx, dy, w))
    return out


def kde_cells_sql(
    src_sql: str,
    cell_deg: float,
    sigma_cells: float,
    radius_cells: int,
    lat0: float,
    lat1: float,
    lon: str = "lon",
    lat: str = "lat",
) -> str:
    """Dialect-neutral twin of :func:`kde_cells` (shared-string oracle).

    density = sum_j w(d_ij) * x_j over the kernel disk, with w the
    fixed-point Gaussian of :func:`kernel_offsets`. The per-target sum
    is BIGINT-exact; the one trailing division by the weight scale is a
    single IEEE op on identical inputs, so both engines emit the same
    double bit-for-bit (rounded to 6 anyway, per convention).
    """
    nx, _, _ = _grid_params(cell_deg)
    _check_window_nx(nx, radius_cells)
    cy0, cy1 = _lat_band(cell_deg, lat0, lat1)
    offs = ", ".join(
        f"({dx}, {dy}, {w})"
        for dx, dy, w in kernel_offsets(sigma_cells, radius_cells)
    )
    counts = _counts_sql(src_sql, cell_deg, cy0, cy1, lon, lat)
    return (
        f"WITH counts AS ({counts}), "
        f"offs(dx, dy, w) AS (VALUES {offs}), "
        f"scat AS (SELECT ((c.cx + o.dx + {nx}) % {nx}) AS tx, "
        f"(c.cy + o.dy) AS ty, c.cnt * CAST(o.w AS BIGINT) AS wc "
        f"FROM counts c CROSS JOIN offs o "
        f"WHERE (c.cy + o.dy) >= {cy0} AND (c.cy + o.dy) < {cy1}) "
        f"SELECT tx AS cell_x, ty AS cell_y, "
        f"round(CAST(CAST(sum(wc) AS BIGINT) AS DOUBLE) "
        f"/ {_pf(float(_KDE_SCALE))}, 6) AS kde "
        f"FROM scat GROUP BY tx, ty"
    )


def kde_cells(
    df: DataFrame,
    cell_deg: float,
    sigma_cells: float,
    radius_cells: int,
    lat0: float,
    lat1: float,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Gaussian kernel-smoothed event intensity per lattice cell.

    Plan: one corpus hash-aggregate to the cell table, then a bounded
    kernel-disk Generate + one cell aggregate — two exchanges total,
    both over tables bounded by the graticule, with the kernel weights
    folded as integer literals (see :func:`kernel_offsets`).
    """
    nx, _, _ = _grid_params(cell_deg)
    _check_window_nx(nx, radius_cells)
    cy0, cy1 = _lat_band(cell_deg, lat0, lat1)
    _, cx, cy = cell_id_sql(cell_deg, lon, lat)
    counts = (
        df.selectExpr(f"{cx} AS cx", f"{cy} AS cy")
        .filter(f"cy >= {cy0} AND cy < {cy1}")
        .groupBy("cx", "cy")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    offs = ", ".join(
        f"struct({dx} AS dx, {dy} AS dy, {w}L AS w)"
        for dx, dy, w in kernel_offsets(sigma_cells, radius_cells)
    )
    scat = counts.selectExpr(
        f"explode(array({offs})) AS o", "cx", "cy", "cnt"
    ).selectExpr(
        f"((cx + o.dx + {nx}) % {nx}) AS tx",
        "(cy + o.dy) AS ty",
        "cnt * o.w AS wc",
    ).filter(f"ty >= {cy0} AND ty < {cy1}")
    return scat.groupBy("tx", "ty").agg(
        F.sum("wc").cast("bigint").alias("_s")
    ).selectExpr(
        "tx AS cell_x", "ty AS cell_y",
        f"round(CAST(_s AS DOUBLE) / {_pf(float(_KDE_SCALE))}, 6) AS kde",
    )

# ----------------------------------------------------------- Moran's I --

def _moran_lattice(cell_deg: float, lat0: float, lat1: float) -> tuple:
    """(nx, cy0, cy1, n_cells, w_sum) for the binary 3x3-minus-self
    weight matrix over the FIXED study lattice. Row sums depend only on
    the lat row (lon wraps, so there is no lon edge): 8 in the interior,
    5 on the two lat-edge rows (3 clipped neighbors). W = sum of ALL
    row sums — including empty cells, which the pair sum never sees but
    the normalization must count."""
    nx, _, _ = _grid_params(cell_deg)
    _check_window_nx(nx, 1)
    cy0, cy1 = _lat_band(cell_deg, lat0, lat1)
    ny = cy1 - cy0
    if ny < 2:
        raise ValueError(
            f"Moran's I needs at least 2 lat rows, got {ny} "
            f"(lat0={lat0}, lat1={lat1}, cell_deg={cell_deg})"
        )
    n_cells = nx * ny
    w_sum = nx * (8 * (ny - 2) + 2 * 5)
    return nx, cy0, cy1, n_cells, w_sum


def _moran_moments_sql(
    src_sql: str, cell_deg: float, lat0: float, lat1: float,
    lon: str, lat: str,
) -> tuple:
    """(moments_sql, n_cells, w_sum): one CTE chain producing the four
    exact-BIGINT moments Moran's I needs — sx = Σx, sxx = Σx², rsum =
    Σ rowsum_i·x_i (row sums via a CASE on the lat row), psum =
    Σ_ij w_ij·x_i·x_j via the 8-offset scatter joined back to the
    PRESENT cells (empty cells contribute 0 to the pair sum). Everything
    integer until the final formula."""
    nx, cy0, cy1, n_cells, w_sum = _moran_lattice(
        cell_deg, lat0, lat1,
    )
    offs = ", ".join(
        f"({dx}, {dy})"
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)
        if not (dx == 0 and dy == 0)
    )
    counts = _counts_sql(src_sql, cell_deg, cy0, cy1, lon, lat)
    rowsum = (
        f"(CASE WHEN cy = {cy0} OR cy = {cy1 - 1} THEN 5 ELSE 8 END)"
    )
    moments = (
        f"WITH counts AS ({counts}), "
        f"offs(dx, dy) AS (VALUES {offs}), "
        f"scat AS (SELECT ((c.cx + o.dx + {nx}) % {nx}) AS tx, "
        f"(c.cy + o.dy) AS ty, c.cnt "
        f"FROM counts c CROSS JOIN offs o "
        f"WHERE (c.cy + o.dy) >= {cy0} AND (c.cy + o.dy) < {cy1}), "
        f"pair AS (SELECT CAST(coalesce(sum(s.cnt * t.cnt), 0) AS BIGINT) AS psum "
        f"FROM scat s JOIN counts t ON s.tx = t.cx AND s.ty = t.cy), "
        f"mom AS (SELECT CAST(sum(cnt) AS BIGINT) AS sx, "
        f"CAST(sum(cnt * cnt) AS BIGINT) AS sxx, "
        f"CAST(sum({rowsum} * cnt) AS BIGINT) AS rsum FROM counts) "
        f"SELECT sx, sxx, rsum, psum FROM mom CROSS JOIN pair"
    )
    return moments, n_cells, w_sum


def morans_i_sql(
    src_sql: str,
    cell_deg: float,
    lat0: float,
    lat1: float,
    lon: str = "lon",
    lat: str = "lat",
) -> str:
    """Global Moran's I of the event-count surface (one dialect-shared
    string — both engines evaluate the identical expression tree).

    I = (n/W) · Σ_ij w_ij (x_i−m)(x_j−m) / Σ_i (x_i−m)²  over the FIXED
    lattice (empty cells x=0, exactly like Gi*), w = binary 3x3 minus
    self, lon wrapped. Expanding around the exact integer moments:

        num = psum − 2·m·rsum + m²·W      (m = sx/n, the only doubles)
        den = sxx − n·m²

    so the statistic is a single closed-form double expression over four
    BIGINT-exact sums — order-independent across engines/partitionings.
    Output: one row (n_cells, w_sum, sx, sxx, rsum, psum, morans_i);
    morans_i is NULL for a constant surface (den = 0), round(.,6).
    """
    moments, n_cells, w_sum = _moran_moments_sql(
        src_sql, cell_deg, lat0, lat1, lon, lat,
    )
    n = f"{n_cells}.0E0"
    w = f"{w_sum}.0E0"
    m = f"(CAST(sx AS DOUBLE) / {n})"
    return (
        f"SELECT CAST({n_cells} AS BIGINT) AS n_cells, "
        f"CAST({w_sum} AS BIGINT) AS w_sum, sx, sxx, rsum, psum, "
        f"round(({n} / {w}) "
        f"* (CAST(psum AS DOUBLE) - 2.0E0 * {m} * CAST(rsum AS DOUBLE) "
        f"+ {m} * {m} * {w}) "
        f"/ nullif(CAST(sxx AS DOUBLE) - {n} * {m} * {m}, 0.0E0), 6) "
        f"AS morans_i FROM ({moments}) mm"
    )


def morans_i(
    df: DataFrame,
    cell_deg: float,
    lat0: float,
    lat1: float,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Global Moran's I (see :func:`morans_i_sql`). Plan: ONE corpus
    hash-aggregate (map-side partials) down to the cell table, the
    bounded 8-offset Generate, one CELL-sized self-join for the pair
    sum, and 1-row aggregates — the corpus is scanned once; every join
    side is bounded by the graticule."""
    nx, cy0, cy1, n_cells, w_sum = _moran_lattice(cell_deg, lat0, lat1)
    _, cx, cy = cell_id_sql(cell_deg, lon, lat)
    counts = (
        df.selectExpr(f"{cx} AS cx", f"{cy} AS cy")
        .filter(f"cy >= {cy0} AND cy < {cy1}")
        .groupBy("cx", "cy")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    offs = ", ".join(
        f"struct({dx} AS dx, {dy} AS dy)"
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)
        if not (dx == 0 and dy == 0)
    )
    scat = counts.selectExpr(
        f"explode(array({offs})) AS o", "cx", "cy", "cnt"
    ).selectExpr(
        f"((cx + o.dx + {nx}) % {nx}) AS tx", "(cy + o.dy) AS ty",
        "cnt AS scnt",
    ).filter(f"ty >= {cy0} AND ty < {cy1}")
    pair = scat.join(
        counts, (scat.tx == counts.cx) & (scat.ty == counts.cy)
    ).agg(
        F.expr(
            "CAST(coalesce(sum(scnt * cnt), 0) AS BIGINT)"
        ).alias("psum")
    )
    rowsum = (
        f"(CASE WHEN cy = {cy0} OR cy = {cy1 - 1} THEN 5 ELSE 8 END)"
    )
    mom = counts.selectExpr("cx", "cy", "cnt", f"{rowsum} AS rw").agg(
        F.sum("cnt").cast("bigint").alias("sx"),
        F.sum(F.col("cnt") * F.col("cnt")).cast("bigint").alias("sxx"),
        F.sum(F.col("rw") * F.col("cnt")).cast("bigint").alias("rsum"),
    )
    n = f"{n_cells}.0E0"
    w = f"{w_sum}.0E0"
    m = f"(CAST(sx AS DOUBLE) / {n})"
    return mom.crossJoin(F.broadcast(pair)).selectExpr(
        f"CAST({n_cells} AS BIGINT) AS n_cells",
        f"CAST({w_sum} AS BIGINT) AS w_sum",
        "sx", "sxx", "rsum", "psum",
        f"round(({n} / {w}) "
        f"* (CAST(psum AS DOUBLE) - 2.0E0 * {m} * CAST(rsum AS DOUBLE) "
        f"+ {m} * {m} * {w}) "
        f"/ nullif(CAST(sxx AS DOUBLE) - {n} * {m} * {m}, 0.0E0), 6) "
        f"AS morans_i",
    )


# -------------------------------- permutation inference (Moran's I) --

def _perm_reps_check(n_reps: int) -> None:
    if not 1 <= n_reps <= 9999:
        raise ValueError(
            f"n_reps must be in [1, 9999] (the replication fan-out is a "
            f"literal VALUES table), got {n_reps}"
        )


def _perm_prefix_sql(
    counts: str, nx: int, cy0: int, cy1: int, n_reps: int, seed: str,
) -> str:
    """Shared CTE text (no leading WITH) producing the exact hash
    permutations of the lattice field: ``counts`` (corpus agg) →
    ``field`` (full lattice, zeros filled) → ``valr`` (values ranked by
    md5 per replication, cx/cy tiebreak) → ``permocc`` (value rank
    zipped against the CLOSED-FORM canonical position order, occupied
    rows only). A uniformly random bijection per replication under the
    random-oracle model — no RNG state (sampling.py hash contract);
    everything after ``counts`` is lattice × n_reps bounded."""
    xs = ", ".join(f"({i})" for i in range(nx))
    ys = ", ".join(f"({cy})" for cy in range(cy0, cy1))
    reps = ", ".join(f"({r})" for r in range(1, n_reps + 1))
    hv = (
        f"md5(concat('mv', '{seed}', ':', CAST(q.r AS STRING), ':', "
        f"CAST(f.cx AS STRING), ':', CAST(f.cy AS STRING)))"
    )
    return (
        f"counts AS ({counts}), "
        f"xs(cx) AS (VALUES {xs}), "
        f"ys(cy) AS (VALUES {ys}), "
        f"reps(r) AS (VALUES {reps}), "
        f"field AS (SELECT l.cx, l.cy, "
        f"CAST(coalesce(c.cnt, 0) AS BIGINT) AS x "
        f"FROM (SELECT cx, cy FROM xs CROSS JOIN ys) l "
        f"LEFT JOIN counts c ON l.cx = c.cx AND l.cy = c.cy), "
        # canonical position order is closed-form; only the value order
        # needs a window (ONE window level — DuckDB nested-window safe)
        f"valr AS (SELECT q.r, f.x, row_number() OVER ("
        f"PARTITION BY q.r ORDER BY {hv}, f.cx, f.cy) AS rk "
        f"FROM field f CROSS JOIN reps q), "
        f"permocc AS (SELECT v.r, "
        f"CAST((v.rk - 1) % {nx} AS BIGINT) AS cx, "
        f"CAST({cy0} + ((v.rk - 1) - (v.rk - 1) % {nx}) / {nx} AS BIGINT)"
        f" AS cy, v.x FROM valr v WHERE v.x > 0)"
    )


def morans_i_p_sql(
    src_sql: str,
    cell_deg: float,
    lat0: float,
    lat1: float,
    n_reps: int = 199,
    seed: str = "r5",
    lon: str = "lon",
    lat: str = "lat",
    counts_override: str | None = None,
) -> str:
    """Global Moran's I with a deterministic EXACT-permutation pseudo
    p-value (Anselin's conditional-randomization inference for the
    global statistic, GeoDa-style: p_sim = (1+M)/(R+1) with M = the
    replications at least as extreme as the observed I, in its
    direction vs E[I] = -1/(n-1)).

    The permutation group is exact, not approximated: replication r
    ranks all n_cells lattice values by md5('mv',seed,r,cx,cy) (cx,cy
    tiebreak) and zips that order against the canonical position order
    — a uniformly random bijection of values onto positions under the
    random-oracle model, with NO RNG state (the repo's hash-uniform
    contract, sampling.py:25). Σx and Σx² are permutation-invariant, so
    each replication only recomputes the pair sum (8-offset scatter
    over its OCCUPIED cells — zeros never join) and the edge-weighted
    row sum. 100-TB posture: ONE corpus aggregate to the cell table;
    everything downstream is lattice × n_reps bounded (n_cells·R
    window rows, K·8·R join rows).

    Output: one row (n_cells, w_sum, n_reps, morans_i, e_null, n_ge,
    n_le, p_upper, p_lower, p_sim); floats round(.,6). The I_r
    comparison uses the unrounded doubles — every quantity is rational
    arithmetic over exact BIGINT sums (no libm), so both dialects
    compare identical values. Constant surface (den = 0): morans_i and
    the p columns are NULL.
    """
    _perm_reps_check(n_reps)
    nx, cy0, cy1, n_cells, w_sum = _moran_lattice(cell_deg, lat0, lat1)
    counts = counts_override or _counts_sql(
        src_sql, cell_deg, cy0, cy1, lon, lat,
    )
    offs = ", ".join(
        f"({dx}, {dy})"
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)
        if not (dx == 0 and dy == 0)
    )
    rowsum = (
        f"(CASE WHEN cy = {cy0} OR cy = {cy1 - 1} THEN 5 ELSE 8 END)"
    )
    n = f"{n_cells}.0E0"
    w = f"{w_sum}.0E0"
    m = f"(CAST(sx AS DOUBLE) / {n})"
    i_of = (
        f"(({n} / {w}) * (CAST({{p}} AS DOUBLE) - 2.0E0 * {m} * "
        f"CAST({{r}} AS DOUBLE) + {m} * {m} * {w}) "
        f"/ nullif(CAST(sxx AS DOUBLE) - {n} * {m} * {m}, 0.0E0))"
    )
    i_obs = i_of.format(p="psum", r="rsum")
    i_rep = i_of.format(p="psum_r", r="rsum_r")
    e0 = f"(0.0E0 - 1.0E0 / ({n} - 1.0E0))"
    return (
        f"WITH {_perm_prefix_sql(counts, nx, cy0, cy1, n_reps, seed)}, "
        f"offs(dx, dy) AS (VALUES {offs}), "
        f"scat_r AS (SELECT p.r, ((p.cx + o.dx + {nx}) % {nx}) AS tx, "
        f"(p.cy + o.dy) AS ty, p.x FROM permocc p CROSS JOIN offs o "
        f"WHERE (p.cy + o.dy) >= {cy0} AND (p.cy + o.dy) < {cy1}), "
        f"rep_mom AS (SELECT q.r, "
        f"CAST(coalesce(pr.psum_r, 0) AS BIGINT) AS psum_r, "
        f"CAST(coalesce(rs.rsum_r, 0) AS BIGINT) AS rsum_r FROM reps q "
        f"LEFT JOIN (SELECT s.r, sum(s.x * t.x) AS psum_r FROM scat_r s "
        f"JOIN permocc t ON s.r = t.r AND s.tx = t.cx AND s.ty = t.cy "
        f"GROUP BY s.r) pr ON q.r = pr.r "
        f"LEFT JOIN (SELECT r, sum({rowsum} * x) AS rsum_r "
        f"FROM permocc GROUP BY r) rs ON q.r = rs.r), "
        f"mom AS (SELECT CAST(sum(cnt) AS BIGINT) AS sx, "
        f"CAST(sum(cnt * cnt) AS BIGINT) AS sxx, "
        f"CAST(sum({rowsum} * cnt) AS BIGINT) AS rsum FROM counts), "
        f"pair AS (SELECT CAST(coalesce(sum(s.x * t.x), 0) AS BIGINT) "
        f"AS psum FROM (SELECT ((p.cx + o.dx + {nx}) % {nx}) AS tx, "
        f"(p.cy + o.dy) AS ty, p.x FROM "
        f"(SELECT cx, cy, cnt AS x FROM counts) p CROSS JOIN offs o "
        f"WHERE (p.cy + o.dy) >= {cy0} AND (p.cy + o.dy) < {cy1}) s "
        f"JOIN (SELECT cx, cy, cnt AS x FROM counts) t "
        f"ON s.tx = t.cx AND s.ty = t.cy), "
        f"tails AS (SELECT "
        f"CAST(sum(CASE WHEN {i_rep} >= {i_obs} THEN 1 ELSE 0 END) "
        f"AS BIGINT) AS n_ge, "
        f"CAST(sum(CASE WHEN {i_rep} <= {i_obs} THEN 1 ELSE 0 END) "
        f"AS BIGINT) AS n_le "
        f"FROM rep_mom CROSS JOIN mom CROSS JOIN pair) "
        f"SELECT CAST({n_cells} AS BIGINT) AS n_cells, "
        f"CAST({w_sum} AS BIGINT) AS w_sum, "
        f"CAST({n_reps} AS BIGINT) AS n_reps, "
        f"round({i_obs}, 6) AS morans_i, "
        f"round({e0}, 6) AS e_null, n_ge, n_le, "
        f"round((1.0E0 + n_ge) / {n_reps + 1}.0E0, 6) AS p_upper, "
        f"round((1.0E0 + n_le) / {n_reps + 1}.0E0, 6) AS p_lower, "
        f"round(CASE WHEN {i_obs} IS NULL THEN NULL "
        f"WHEN {i_obs} >= {e0} "
        f"THEN (1.0E0 + n_ge) / {n_reps + 1}.0E0 "
        f"ELSE (1.0E0 + n_le) / {n_reps + 1}.0E0 END, 6) AS p_sim "
        f"FROM tails CROSS JOIN mom CROSS JOIN pair"
    )


def global_autocorr_p_sql(
    src_sql: str,
    cell_deg: float,
    lat0: float,
    lat1: float,
    n_reps: int = 199,
    seed: str = "r5",
    lon: str = "lon",
    lat: str = "lat",
    counts_override: str | None = None,
) -> str:
    """The three global autocorrelation statistics — Moran's I, Geary's
    C, Getis-Ord General G — with pseudo p-values from ONE shared set of
    exact hash-rank permutations (the :func:`morans_i_p` group). The
    marginal cost over Moran alone is a single extra replication moment:

        I_r needs (psum_r, rsum_r);  C_r adds rs2_r = Σ rowsum·x²;
        G_r needs only psum_r (its denominator Σ_{i≠j} x_i x_j =
        sx² − sxx is permutation-INVARIANT).

    Formula conventions match the engine's own :func:`morans_i` /
    :func:`gearys_c` / :func:`general_g` exactly (pinned by pytest):
    C = (n−1)(rsum2 − psum)/(W(sxx − n·m²)), G = psum/(sx² − sxx).
    Directional p per statistic: Moran vs E[I] = −1/(n−1); Geary vs
    E[C] = 1 (C < 1 = clustering → lower tail); G vs its permutation
    mean (p_g_upper counts G_r >= G_obs when G_obs >= mean of G_r, else
    the lower tail). All comparisons are rational arithmetic over exact
    BIGINT sums — cross-engine tallies identical. One corpus aggregate;
    everything downstream lattice × n_reps bounded.

    Output: one row (n_cells, w_sum, n_reps, morans_i, p_moran,
    gearys_c, p_geary, general_g, p_g); floats round(.,6); NULL
    statistics (constant surface / all-zero G denominator) yield NULL
    p columns.
    """
    _perm_reps_check(n_reps)
    nx, cy0, cy1, n_cells, w_sum = _moran_lattice(cell_deg, lat0, lat1)
    counts = counts_override or _counts_sql(
        src_sql, cell_deg, cy0, cy1, lon, lat,
    )
    offs = ", ".join(
        f"({dx}, {dy})"
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)
        if not (dx == 0 and dy == 0)
    )
    rowsum = (
        f"(CASE WHEN cy = {cy0} OR cy = {cy1 - 1} THEN 5 ELSE 8 END)"
    )
    n = f"{n_cells}.0E0"
    w = f"{w_sum}.0E0"
    m = f"(CAST(sx AS DOUBLE) / {n})"
    den = f"nullif(CAST(sxx AS DOUBLE) - {n} * {m} * {m}, 0.0E0)"
    i_of = (
        f"(({n} / {w}) * (CAST({{p}} AS DOUBLE) - 2.0E0 * {m} * "
        f"CAST({{r}} AS DOUBLE) + {m} * {m} * {w}) / {den})"
    )
    c_of = (
        f"({_pf(float(n_cells - 1))} * (CAST({{r2}} AS DOUBLE) "
        f"- CAST({{p}} AS DOUBLE)) / ({w} * {den}))"
    )
    g_of = (
        f"(CAST({{p}} AS DOUBLE) / nullif(CAST(sx AS DOUBLE) "
        f"* CAST(sx AS DOUBLE) - CAST(sxx AS DOUBLE), 0.0E0))"
    )
    i_obs = i_of.format(p="psum", r="rsum")
    i_rep = i_of.format(p="psum_r", r="rsum_r")
    c_obs = c_of.format(p="psum", r2="rsum2")
    c_rep = c_of.format(p="psum_r", r2="rs2_r")
    g_obs = g_of.format(p="psum")
    g_rep = g_of.format(p="psum_r")
    e0 = f"(0.0E0 - 1.0E0 / ({n} - 1.0E0))"
    eg = f"({w} / ({n} * ({n} - 1.0E0)))"
    R1 = f"{n_reps + 1}.0E0"
    return (
        f"WITH {_perm_prefix_sql(counts, nx, cy0, cy1, n_reps, seed)}, "
        f"offs(dx, dy) AS (VALUES {offs}), "
        f"scat_r AS (SELECT p.r, ((p.cx + o.dx + {nx}) % {nx}) AS tx, "
        f"(p.cy + o.dy) AS ty, p.x FROM permocc p CROSS JOIN offs o "
        f"WHERE (p.cy + o.dy) >= {cy0} AND (p.cy + o.dy) < {cy1}), "
        f"rep_mom AS (SELECT q.r, "
        f"CAST(coalesce(pr.psum_r, 0) AS BIGINT) AS psum_r, "
        f"CAST(coalesce(rs.rsum_r, 0) AS BIGINT) AS rsum_r, "
        f"CAST(coalesce(rs.rs2_r, 0) AS BIGINT) AS rs2_r FROM reps q "
        f"LEFT JOIN (SELECT s.r, sum(s.x * t.x) AS psum_r FROM scat_r s "
        f"JOIN permocc t ON s.r = t.r AND s.tx = t.cx AND s.ty = t.cy "
        f"GROUP BY s.r) pr ON q.r = pr.r "
        f"LEFT JOIN (SELECT r, sum({rowsum} * x) AS rsum_r, "
        f"sum({rowsum} * x * x) AS rs2_r "
        f"FROM permocc GROUP BY r) rs ON q.r = rs.r), "
        f"mom AS (SELECT CAST(sum(cnt) AS BIGINT) AS sx, "
        f"CAST(sum(cnt * cnt) AS BIGINT) AS sxx, "
        f"CAST(sum({rowsum} * cnt) AS BIGINT) AS rsum, "
        f"CAST(sum({rowsum} * cnt * cnt) AS BIGINT) AS rsum2 "
        f"FROM counts), "
        f"pair AS (SELECT CAST(coalesce(sum(s.x * t.x), 0) AS BIGINT) "
        f"AS psum FROM (SELECT ((p.cx + o.dx + {nx}) % {nx}) AS tx, "
        f"(p.cy + o.dy) AS ty, p.x FROM "
        f"(SELECT cx, cy, cnt AS x FROM counts) p CROSS JOIN offs o "
        f"WHERE (p.cy + o.dy) >= {cy0} AND (p.cy + o.dy) < {cy1}) s "
        f"JOIN (SELECT cx, cy, cnt AS x FROM counts) t "
        f"ON s.tx = t.cx AND s.ty = t.cy), "
        f"tails AS (SELECT "
        f"CAST(sum(CASE WHEN {i_rep} >= {i_obs} THEN 1 ELSE 0 END) "
        f"AS BIGINT) AS i_ge, "
        f"CAST(sum(CASE WHEN {i_rep} <= {i_obs} THEN 1 ELSE 0 END) "
        f"AS BIGINT) AS i_le, "
        f"CAST(sum(CASE WHEN {c_rep} >= {c_obs} THEN 1 ELSE 0 END) "
        f"AS BIGINT) AS c_ge, "
        f"CAST(sum(CASE WHEN {c_rep} <= {c_obs} THEN 1 ELSE 0 END) "
        f"AS BIGINT) AS c_le, "
        f"CAST(sum(CASE WHEN {g_rep} >= {g_obs} THEN 1 ELSE 0 END) "
        f"AS BIGINT) AS g_ge, "
        f"CAST(sum(CASE WHEN {g_rep} <= {g_obs} THEN 1 ELSE 0 END) "
        f"AS BIGINT) AS g_le "
        f"FROM rep_mom CROSS JOIN mom CROSS JOIN pair) "
        f"SELECT CAST({n_cells} AS BIGINT) AS n_cells, "
        f"CAST({w_sum} AS BIGINT) AS w_sum, "
        f"CAST({n_reps} AS BIGINT) AS n_reps, "
        f"round({i_obs}, 6) AS morans_i, "
        f"round(CASE WHEN {i_obs} IS NULL THEN NULL "
        f"WHEN {i_obs} >= {e0} THEN (1.0E0 + i_ge) / {R1} "
        f"ELSE (1.0E0 + i_le) / {R1} END, 6) AS p_moran, "
        f"round({c_obs}, 6) AS gearys_c, "
        f"round(CASE WHEN {c_obs} IS NULL THEN NULL "
        f"WHEN {c_obs} <= 1.0E0 THEN (1.0E0 + c_le) / {R1} "
        f"ELSE (1.0E0 + c_ge) / {R1} END, 6) AS p_geary, "
        f"round({g_obs}, 6) AS general_g, "
        f"round(CASE WHEN {g_obs} IS NULL THEN NULL "
        f"WHEN {g_obs} >= {eg} THEN (1.0E0 + g_ge) / {R1} "
        f"ELSE (1.0E0 + g_le) / {R1} END, 6) AS p_g "
        f"FROM tails CROSS JOIN mom CROSS JOIN pair"
    )


def global_autocorr_p(
    df: DataFrame,
    cell_deg: float,
    lat0: float,
    lat1: float,
    n_reps: int = 199,
    seed: str = "r5",
    lon: str = "lon",
    lat: str = "lat",
    view: str = "_autoc_p_src",
) -> DataFrame:
    """DataFrame twin of :func:`global_autocorr_p_sql` — counts
    localCheckpoint-materialized once (Spark re-inlines CTEs; see
    :func:`morans_i_p`); second-tier truth: statistic equality with the
    engine's own morans_i/gearys_c/general_g + the planted/CSR battery
    in tests/test_gridstats.py."""
    df.createOrReplaceTempView(view)
    _, cy0, cy1, _, _ = _moran_lattice(cell_deg, lat0, lat1)
    counts = df.sparkSession.sql(_counts_sql(
        f"SELECT * FROM {view}", cell_deg, cy0, cy1, lon, lat,
    )).localCheckpoint()
    counts.createOrReplaceTempView(view + "_counts")
    # r6 note: materializing permocc too (its window pipeline feeds
    # three aggregates) halves executor time (60 s -> 31 s of stage
    # time at sf0.1) but LOSES wall on an idle box — the checkpoint
    # barrier serializes subtrees AQE otherwise runs concurrently as
    # broadcast futures, and the duplicated work is lattice x n_reps
    # BOUNDED (a fixed cost at any corpus size), unlike a duplicated
    # corpus scan. Measured 2.21 s -> 2.62 s in-suite, so the r5 shape
    # stays: only the corpus aggregate is pinned.
    return df.sparkSession.sql(
        global_autocorr_p_sql(
            f"SELECT * FROM {view}", cell_deg, lat0, lat1,
            n_reps=n_reps, seed=seed, lon=lon, lat=lat,
            counts_override=f"SELECT cx, cy, cnt FROM {view}_counts",
        )
    )


def morans_i_p(
    df: DataFrame,
    cell_deg: float,
    lat0: float,
    lat1: float,
    n_reps: int = 199,
    seed: str = "r5",
    lon: str = "lon",
    lat: str = "lat",
    view: str = "_morans_i_p_src",
) -> DataFrame:
    """DataFrame twin of :func:`morans_i_p_sql` — the same dialect-
    neutral string through Catalyst (shared-CTE oracle; the mandatory
    second-tier truth is the planted cluster / CSR battery in
    tests/test_gridstats.py), with ONE deviation for the 100-TB plan
    shape: Spark inlines every CTE reference, so the corpus-aggregate
    ``counts`` table is materialized ONCE via localCheckpoint and the
    executed string reads the checkpointed view instead of re-deriving
    it per reference (the oracle keeps the full self-contained
    derivation — identical text downstream of ``counts``)."""
    df.createOrReplaceTempView(view)
    _, cy0, cy1, _, _ = _moran_lattice(cell_deg, lat0, lat1)
    counts = df.sparkSession.sql(_counts_sql(
        f"SELECT * FROM {view}", cell_deg, cy0, cy1, lon, lat,
    )).localCheckpoint()
    counts.createOrReplaceTempView(view + "_counts")
    return df.sparkSession.sql(
        morans_i_p_sql(
            f"SELECT * FROM {view}", cell_deg, lat0, lat1,
            n_reps=n_reps, seed=seed, lon=lon, lat=lat,
            counts_override=f"SELECT cx, cy, cnt FROM {view}_counts",
        )
    )


def local_morans_i_p_sql(
    src_sql: str,
    cell_deg: float,
    lat0: float,
    lat1: float,
    n_reps: int = 199,
    seed: str = "r5",
    lon: str = "lon",
    lat: str = "lat",
    counts_override: str | None = None,
) -> str:
    """Anselin Local Moran's I (LISA) with per-cell permutation pseudo
    p-values (the GeoDa significance map). Same statistic and cell set
    as :func:`local_morans_i`; each replication applies ONE global
    hash-permutation of the lattice values (``_perm_prefix_sql`` — the
    repo's no-RNG hash-uniform contract) and recomputes every cell's
    neighbor lag. This is TOTAL randomization: GeoDa's conditional
    scheme excludes cell i's own value from its neighbor draw, a
    O(1/n_cells) perturbation of the null per cell (FIDELITY.md) —
    total keeps all replications on one lattice-bounded plan instead of
    n_cells separate permutation sets.

    Per-cell bookkeeping stays sparse: a replication contributes a join
    row only where the permuted 3x3 window is occupied; the (n_reps −
    present) replications with an empty window all share the SAME lag
    (−rowsum·m), folded in arithmetically. p_sim = (1 + M)/(n_reps+1)
    with M = replications whose I_i is at least as extreme as observed,
    in the observed direction (I >= 0 counts the upper tail). All
    comparisons are rational arithmetic over exact integers — no libm,
    so both dialects tally identically.

    Output: (cell_x, cell_y, cnt, nbr_sum, lisa_i, quadrant, n_ge,
    n_le, p_sim) for cells with >= 1 event in the OBSERVED 3x3 window
    (the :func:`local_morans_i` contract); lisa_i/p columns NULL for a
    constant surface.
    """
    _perm_reps_check(n_reps)
    nx, cy0, cy1, n_cells, w_sum = _moran_lattice(cell_deg, lat0, lat1)
    counts = counts_override or _counts_sql(
        src_sql, cell_deg, cy0, cy1, lon, lat,
    )
    offs = ", ".join(
        f"({dx}, {dy})"
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)
        if not (dx == 0 and dy == 0)
    )
    n = f"{n_cells}.0E0"
    m = f"(CAST(sx AS DOUBLE) / {n})"
    den = f"(CAST(sxx AS DOUBLE) - {n} * {m} * {m})"
    # base-cell expressions (alias b = the observed LISA row)
    rw_b = (
        f"(CASE WHEN b.cell_y = {cy0} OR b.cell_y = {cy1 - 1} "
        f"THEN 5.0E0 ELSE 8.0E0 END)"
    )
    dev_b = f"(CAST(b.cnt AS DOUBLE) - {m})"
    cst = f"({n} / nullif({den}, 0.0E0) * {dev_b})"
    lag_obs = f"(CAST(b.nbr_sum AS DOUBLE) - {rw_b} * {m})"
    i_obs = f"({cst} * {lag_obs})"
    lag_p = f"(CAST(coalesce(wr.nbr_sum_r, 0) AS DOUBLE) - {rw_b} * {m})"
    i_p = f"({cst} * {lag_p})"
    lag_0 = f"(0.0E0 - {rw_b} * {m})"
    i_0 = f"({cst} * {lag_0})"
    return (
        f"WITH {_perm_prefix_sql(counts, nx, cy0, cy1, n_reps, seed)}, "
        f"offs(dx, dy) AS (VALUES {offs}), "
        f"mm AS (SELECT CAST(sum(cnt) AS BIGINT) AS sx, "
        f"CAST(sum(cnt * cnt) AS BIGINT) AS sxx FROM counts), "
        # observed per-cell window sums -> the output cell set
        f"scat AS (SELECT ((cc.cx + o.dx + {nx}) % {nx}) AS tx, "
        f"(cc.cy + o.dy) AS ty, cc.cnt "
        f"FROM counts cc CROSS JOIN offs o "
        f"WHERE (cc.cy + o.dy) >= {cy0} AND (cc.cy + o.dy) < {cy1}), "
        f"win AS (SELECT tx, ty, CAST(sum(cnt) AS BIGINT) AS nbr_sum "
        f"FROM scat GROUP BY tx, ty), "
        f"base AS (SELECT coalesce(w.tx, c.cx) AS cell_x, "
        f"coalesce(w.ty, c.cy) AS cell_y, "
        f"CAST(coalesce(c.cnt, 0) AS BIGINT) AS cnt, "
        f"CAST(coalesce(w.nbr_sum, 0) AS BIGINT) AS nbr_sum "
        f"FROM win w FULL OUTER JOIN counts c "
        f"ON c.cx = w.tx AND c.cy = w.ty), "
        # permuted window sums, sparse: only occupied windows join
        f"scat_r AS (SELECT p.r, ((p.cx + o.dx + {nx}) % {nx}) AS tx, "
        f"(p.cy + o.dy) AS ty, p.x FROM permocc p CROSS JOIN offs o "
        f"WHERE (p.cy + o.dy) >= {cy0} AND (p.cy + o.dy) < {cy1}), "
        f"win_r AS (SELECT r, tx, ty, CAST(sum(x) AS BIGINT) "
        f"AS nbr_sum_r FROM scat_r GROUP BY r, tx, ty), "
        f"pres AS (SELECT b.cell_x, b.cell_y, "
        f"CAST(count(wr.r) AS BIGINT) AS n_pres, "
        # wr.r IS NOT NULL guards the coalesced no-match row of the LEFT
        # JOIN (a cell with zero occupied-window replications) from
        # being tallied as one replication
        f"CAST(coalesce(sum(CASE WHEN wr.r IS NOT NULL "
        f"AND {i_p} >= {i_obs} THEN 1 ELSE 0 "
        f"END), 0) AS BIGINT) AS ge_pres, "
        f"CAST(coalesce(sum(CASE WHEN wr.r IS NOT NULL "
        f"AND {i_p} <= {i_obs} THEN 1 ELSE 0 "
        f"END), 0) AS BIGINT) AS le_pres "
        f"FROM base b CROSS JOIN mm LEFT JOIN win_r wr "
        f"ON wr.tx = b.cell_x AND wr.ty = b.cell_y "
        f"GROUP BY b.cell_x, b.cell_y) "
        f"SELECT b.cell_x, b.cell_y, b.cnt, b.nbr_sum, "
        f"round({i_obs}, 6) AS lisa_i, "
        f"(CASE WHEN {dev_b} >= 0.0E0 AND {lag_obs} >= 0.0E0 THEN 'HH' "
        f"WHEN {dev_b} < 0.0E0 AND {lag_obs} < 0.0E0 THEN 'LL' "
        f"WHEN {dev_b} >= 0.0E0 THEN 'HL' ELSE 'LH' END) AS quadrant, "
        f"(p.ge_pres + CASE WHEN {i_0} >= {i_obs} "
        f"THEN {n_reps} - p.n_pres ELSE 0 END) AS n_ge, "
        f"(p.le_pres + CASE WHEN {i_0} <= {i_obs} "
        f"THEN {n_reps} - p.n_pres ELSE 0 END) AS n_le, "
        f"round(CASE WHEN {i_obs} IS NULL THEN NULL "
        f"WHEN {i_obs} >= 0.0E0 THEN (1.0E0 + p.ge_pres "
        f"+ CASE WHEN {i_0} >= {i_obs} THEN {n_reps} - p.n_pres "
        f"ELSE 0 END) / {n_reps + 1}.0E0 "
        f"ELSE (1.0E0 + p.le_pres "
        f"+ CASE WHEN {i_0} <= {i_obs} THEN {n_reps} - p.n_pres "
        f"ELSE 0 END) / {n_reps + 1}.0E0 END, 6) AS p_sim "
        f"FROM base b JOIN pres p "
        f"ON b.cell_x = p.cell_x AND b.cell_y = p.cell_y CROSS JOIN mm"
    )


def local_morans_i_p(
    df: DataFrame,
    cell_deg: float,
    lat0: float,
    lat1: float,
    n_reps: int = 199,
    seed: str = "r5",
    lon: str = "lon",
    lat: str = "lat",
    view: str = "_lisa_p_src",
) -> DataFrame:
    """DataFrame twin of :func:`local_morans_i_p_sql` (shared-CTE
    oracle; second-tier truth = planted/CSR battery in
    tests/test_gridstats.py). The corpus-aggregate ``counts`` table is
    localCheckpoint-materialized once (Spark re-inlines CTEs — see
    :func:`morans_i_p`); the oracle string keeps the full
    derivation."""
    df.createOrReplaceTempView(view)
    _, cy0, cy1, _, _ = _moran_lattice(cell_deg, lat0, lat1)
    counts = df.sparkSession.sql(_counts_sql(
        f"SELECT * FROM {view}", cell_deg, cy0, cy1, lon, lat,
    )).localCheckpoint()
    counts.createOrReplaceTempView(view + "_counts")
    return df.sparkSession.sql(
        local_morans_i_p_sql(
            f"SELECT * FROM {view}", cell_deg, lat0, lat1,
            n_reps=n_reps, seed=seed, lon=lon, lat=lat,
            counts_override=f"SELECT cx, cy, cnt FROM {view}_counts",
        )
    )




def _cte_span(sql: str, target: str) -> tuple[int, int, int]:
    """(body_start, body_end, with_end) character spans of CTE ``target``
    in a generated WITH chain: body_start/end delimit the text inside its
    parentheses, with_end is the index just after 'WITH '. Sequential
    balanced-paren scan — generated strings only (quoted literals in this
    module never contain parentheses)."""
    import re as _re

    m = _re.search(r"\bWITH\s+", sql)
    if not m:
        raise ValueError("no WITH chain")
    pos, with_end = m.end(), m.end()
    head_re = _re.compile(
        r"\s*(\w+)\s*(?:\([\w\s,]*\))?\s+AS(?:\s+MATERIALIZED)?\s*\("
    )
    while True:
        hm = head_re.match(sql, pos)
        if not hm:
            raise ValueError(f"CTE {target!r} not found")
        name, open_idx = hm.group(1), hm.end() - 1
        depth, i = 0, open_idx
        while True:
            ch = sql[i]
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    break
            i += 1
        if name == target:
            return open_idx + 1, i, with_end
        pos = i + 1
        cm = _re.compile(r"\s*,").match(sql, pos)
        if not cm:
            raise ValueError(f"CTE {target!r} not found before chain end")
        pos = cm.end()


def _exec_with_materialized_cte(
    spark, sql: str, cte: str, view: str, parts: int | None = None,
):
    """Execute a shared-CTE string with its corpus-aggregate CTE
    materialized ONCE: Spark inlines every CTE reference, so a chain
    whose bounded aggregate is referenced k times re-scans the corpus k
    times (eb_moran's executed plan had 12 parquet scans). The
    aggregate (plus any prefix CTEs it reads) runs standalone, is
    pinned with localCheckpoint, and the original string executes with
    the aggregate's body swapped for a view read — identical text
    everywhere else, so oracle parity is untouched (the oracle runs the
    full self-contained string; DuckDB materialization is handled by
    its own hints where needed)."""
    b0, b1, w0 = _cte_span(sql, cte)
    prefix = sql[w0:b0 - len(cte) - 1]
    # locate the exact start of this CTE's definition to strip it from
    # the standalone prefix: everything before "<cte> AS (" belongs to
    # earlier CTEs
    import re as _re

    dm = _re.search(
        rf"{cte}\s*(?:\([\w\s,]*\))?\s+AS(?:\s+MATERIALIZED)?\s*\($",
        sql[:b0],
    )
    def_start = dm.start()
    pre = sql[w0:def_start].rstrip().rstrip(",")
    body = sql[b0:b1]
    standalone = f"WITH {pre} {body}" if pre.strip() else body
    mat = spark.sql(standalone)
    if parts:
        # r6: AQE coalesces the pipeline's small-byte shuffle to a
        # handful of partitions; when the materialized table feeds
        # CPU-heavy per-row work (permutation joins), re-spread it so
        # downstream stages use the full core count. Round-robin is
        # safe here: every consumer is an exact-integer aggregate.
        mat = mat.repartition(parts)
    mat.localCheckpoint().createOrReplaceTempView(view)
    new_sql = sql[:b0] + f"SELECT * FROM {view}" + sql[b1:]
    return spark.sql(new_sql)


# ---------------------------------------------- Mann-Kendall trend --

def _mk_params(t0_us: int, bin_us: int, n_bins: int) -> None:
    if not bin_us >= 1:
        raise ValueError(f"bin_us must be >= 1, got {bin_us}")
    if not 2 <= n_bins <= 366:
        raise ValueError(
            f"n_bins must be in [2, 366] (the pair term is O(n_bins^2) "
            f"per cell), got {n_bins}"
        )
    if t0_us != int(t0_us):
        raise ValueError(f"t0_us must be integral micros, got {t0_us}")


def _bin_sql(ts_us: str, t0_us: int, bin_us: int) -> str:
    """Exact floor-division time-bin index ((t − t0) − pmod)/D — ONE
    definition shared by Mann-Kendall and emerging hotspots in BOTH
    dialects (four byte-identical copies previously risked silent
    desync)."""
    return (
        f"CAST((({ts_us}) - {int(t0_us)} "
        f"- ((({ts_us}) - {int(t0_us)}) % {int(bin_us)} "
        f"+ {int(bin_us)}) % {int(bin_us)}) / {int(bin_us)} AS BIGINT)"
    )


def _mk_z_sql(T: int) -> tuple:
    """Shared projection (mk_z, trend) over (mk_s, k_bins, tt_present):
    tie-corrected variance with the zero bins (size T-k) as one tie
    group, continuity-corrected z, two-sided 5% trend label."""
    var = (
        f"((CAST({T * (T - 1) * (2 * T + 5)} AS DOUBLE) "
        f"- CAST(tt_present AS DOUBLE) "
        f"- CAST(({T}) - k_bins AS DOUBLE) "
        f"* CAST(({T}) - k_bins - 1 AS DOUBLE) "
        f"* CAST(2 * (({T}) - k_bins) + 5 AS DOUBLE)) / 18.0E0)"
    )
    z = (
        f"(CASE WHEN mk_s > 0 THEN (CAST(mk_s AS DOUBLE) - 1.0E0) "
        f"/ sqrt({var}) "
        f"WHEN mk_s < 0 THEN (CAST(mk_s AS DOUBLE) + 1.0E0) "
        f"/ sqrt({var}) "
        f"ELSE 0.0E0 END)"
    )
    return (
        f"round(CASE WHEN {var} > 0.0E0 THEN {z} END, 6) AS mk_z",
        f"(CASE WHEN {var} > 0.0E0 AND {z} >= 1.96E0 THEN 'increasing' "
        f"WHEN {var} > 0.0E0 AND {z} <= -1.96E0 THEN 'decreasing' "
        f"ELSE 'none' END) AS trend",
    )


def mann_kendall_cells_sql(
    src_sql: str,
    cell_deg: float,
    t0_us: int,
    bin_us: int,
    n_bins: int,
    ts_us: str = "ts_us",
    lon: str = "lon",
    lat: str = "lat",
) -> str:
    """Per-cell Mann-Kendall monotone-trend test of binned event counts
    — the statistic under "emerging hot spot" analysis (Mann 1945,
    Kendall 1975; Hamed's notation): over the FIXED T-bin study period

        S = Σ_{i<j} sign(x_j − x_i)     (x = count, EMPTY BINS x = 0)

    with the tie-corrected variance Var = (T(T−1)(2T+5) − Σ_g g(g−1)
    (2g+5))/18 (each tied value group g; the T−k empty bins form one
    tie group) and the continuity-corrected z = (S ∓ 1)/√Var.

    Zero-filled bins NEVER materialize: S splits into the
    present-present pair sum (a CELL-BOUNDED self-join on bin order)
    plus the present-absent term Σ_i [A_before(i) − A_after(i)], which
    is closed-form from each present bin's index and rank (absent bins
    compare as 0 < x_i, so earlier absents contribute +1, later −1).
    Every sum is BIGINT-exact; z is one shared double expression.

    Output: one row per cell with ≥ 1 event in the study period —
    (cell_x, cell_y, n_events, k_bins, mk_s, mk_z, trend); mk_z NULL
    when the variance vanishes (all T bins tied, only possible at
    k = T with equal counts).
    """
    _grid_params(cell_deg)  # validates cell size
    _mk_params(t0_us, bin_us, n_bins)
    T = int(n_bins)
    _, cx, cy = cell_id_sql(cell_deg, lon, lat)
    binx = _bin_sql(ts_us, t0_us, bin_us)
    return (
        f"WITH ev AS (SELECT {cx} AS cx, {cy} AS cy, {binx} AS b "
        f"FROM ({src_sql}) s), "
        f"c AS (SELECT cx, cy, b, CAST(count(*) AS BIGINT) AS x "
        f"FROM ev WHERE b >= 0 AND b < {T} GROUP BY 1, 2, 3), "
        f"r AS (SELECT cx, cy, b, x, "
        f"CAST(row_number() OVER (PARTITION BY cx, cy ORDER BY b) "
        f"AS BIGINT) AS rn, "
        f"CAST(count(*) OVER (PARTITION BY cx, cy) AS BIGINT) AS k "
        f"FROM c), "
        f"pp AS (SELECT a.cx, a.cy, "
        f"CAST(sum(CASE WHEN b2.x > a.x THEN 1 "
        f"WHEN b2.x < a.x THEN -1 ELSE 0 END) AS BIGINT) AS s_pp "
        f"FROM c a JOIN c b2 ON a.cx = b2.cx AND a.cy = b2.cy "
        f"AND b2.b > a.b GROUP BY 1, 2), "
        f"pa AS (SELECT cx, cy, CAST(max(k) AS BIGINT) AS k_bins, "
        f"CAST(sum(x) AS BIGINT) AS n_events, "
        f"CAST(sum((b - (rn - 1)) - (({T - 1}) - b - (k - rn))) "
        f"AS BIGINT) AS s_pa FROM r GROUP BY 1, 2), "
        f"ties AS (SELECT cx, cy, "
        f"CAST(sum(g * (g - 1) * (2 * g + 5)) AS BIGINT) AS tt_present "
        f"FROM (SELECT cx, cy, x, CAST(count(*) AS BIGINT) AS g "
        f"FROM c GROUP BY 1, 2, 3) gg GROUP BY 1, 2), "
        f"m AS (SELECT pa.cx, pa.cy, pa.n_events, pa.k_bins, "
        f"CAST(coalesce(pp.s_pp, 0) + pa.s_pa AS BIGINT) AS mk_s, "
        f"ties.tt_present FROM pa "
        f"LEFT JOIN pp ON pa.cx = pp.cx AND pa.cy = pp.cy "
        f"JOIN ties ON pa.cx = ties.cx AND pa.cy = ties.cy) "
        f"SELECT cx AS cell_x, cy AS cell_y, n_events, k_bins, mk_s, "
        + ", ".join(_mk_z_sql(T))
        + " FROM m"
    )


def mann_kendall_cells(
    df: DataFrame,
    cell_deg: float,
    t0_us: int,
    bin_us: int,
    n_bins: int,
    ts_us: str = "ts_us",
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Per-cell Mann-Kendall trend (see :func:`mann_kendall_cells_sql`).
    Plan: ONE corpus hash-aggregate (map-side partials) to the
    (cell, bin) table — bounded by cells × T — then a cell-bounded
    ordered self-join for the pair sum, two windows and two aggregates
    all partitioned by cell. The corpus is scanned once; per-cell work
    is O(k²) with k ≤ T ≤ 366 active bins."""
    _grid_params(cell_deg)
    _mk_params(t0_us, bin_us, n_bins)
    T = int(n_bins)
    _, cx, cy = cell_id_sql(cell_deg, lon, lat)
    binx = _bin_sql(ts_us, t0_us, bin_us)
    c = (
        df.selectExpr(f"{cx} AS cx", f"{cy} AS cy", f"{binx} AS b")
        .filter(f"b >= 0 AND b < {T}")
        .groupBy("cx", "cy", "b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    )
    a = c.selectExpr("cx", "cy", "b AS b1", "x AS x1")
    b2 = c.selectExpr("cx AS cx2", "cy AS cy2", "b AS b2", "x AS x2")
    pp = (
        a.join(
            b2,
            (a.cx == b2.cx2) & (a.cy == b2.cy2) & (b2.b2 > a.b1),
        )
        .groupBy("cx", "cy")
        .agg(
            F.expr(
                "CAST(sum(CASE WHEN x2 > x1 THEN 1 "
                "WHEN x2 < x1 THEN -1 ELSE 0 END) AS BIGINT)"
            ).alias("s_pp")
        )
    )
    r = c.selectExpr(
        "cx", "cy", "b", "x",
        "CAST(row_number() OVER (PARTITION BY cx, cy ORDER BY b) "
        "AS BIGINT) AS rn",
        "CAST(count(*) OVER (PARTITION BY cx, cy) AS BIGINT) AS k",
    )
    pa = r.groupBy("cx", "cy").agg(
        F.expr("CAST(max(k) AS BIGINT)").alias("k_bins"),
        F.expr("CAST(sum(x) AS BIGINT)").alias("n_events"),
        F.expr(
            f"CAST(sum((b - (rn - 1)) - (({T - 1}) - b - (k - rn))) "
            f"AS BIGINT)"
        ).alias("s_pa"),
    )
    ties = (
        c.groupBy("cx", "cy", "x")
        .agg(F.count(F.lit(1)).cast("bigint").alias("g"))
        .groupBy("cx", "cy")
        .agg(
            F.expr(
                "CAST(sum(g * (g - 1) * (2 * g + 5)) AS BIGINT)"
            ).alias("tt_present")
        )
    )
    m = (
        pa.join(pp, ["cx", "cy"], "left")
        .join(ties, ["cx", "cy"])
        .selectExpr(
            "cx", "cy", "n_events", "k_bins",
            "CAST(coalesce(s_pp, 0) + s_pa AS BIGINT) AS mk_s",
            "tt_present",
        )
    )
    return m.selectExpr(
        "cx AS cell_x", "cy AS cell_y", "n_events", "k_bins", "mk_s",
        *_mk_z_sql(T),
    )


# -------------------------------------------- bivariate Moran's I --

def _biv_counts_sql(
    src_sql: str, cell_deg: float, cy0: int, cy1: int,
    a_pred: str, b_pred: str, lon: str, lat: str,
) -> str:
    """Per-cell BIGINT counts of the two event classes in ONE pass."""
    _, cx, cy = cell_id_sql(cell_deg, lon, lat)
    return (
        f"SELECT {cx} AS cx, {cy} AS cy, "
        f"CAST(sum(CASE WHEN {a_pred} THEN 1 ELSE 0 END) AS BIGINT) "
        f"AS xa, "
        f"CAST(sum(CASE WHEN {b_pred} THEN 1 ELSE 0 END) AS BIGINT) "
        f"AS xb "
        f"FROM ({src_sql}) s "
        f"WHERE {cy} >= {cy0} AND {cy} < {cy1} "
        f"GROUP BY 1, 2"
    )


def _biv_out_sql(n_cells: int, w_sum: int) -> str:
    """Shared closing expression over the seven exact-BIGINT moments
    (sa, saa, sb, sbb, ra, rb, pab)."""
    n = f"{n_cells}.0E0"
    w = f"{w_sum}.0E0"
    ma = f"(CAST(sa AS DOUBLE) / {n})"
    mb = f"(CAST(sb AS DOUBLE) / {n})"
    num = (
        f"(CAST(pab AS DOUBLE) - {mb} * CAST(ra AS DOUBLE) "
        f"- {ma} * CAST(rb AS DOUBLE) + {ma} * {mb} * {w})"
    )
    den = (
        f"sqrt((CAST(saa AS DOUBLE) - {n} * {ma} * {ma}) "
        f"* (CAST(sbb AS DOUBLE) - {n} * {mb} * {mb}))"
    )
    return (
        f"round(({n} / {w}) * {num} / nullif({den}, 0.0E0), 6) "
        f"AS moran_ab"
    )


def bivariate_morans_i_sql(
    src_sql: str,
    cell_deg: float,
    lat0: float,
    lat1: float,
    a_pred: str,
    b_pred: str,
    lon: str = "lon",
    lat: str = "lat",
) -> str:
    """Bivariate (cross) Moran's I between two event classes
    (Wartenberg 1985): does class A cluster NEXT TO class B?

        I_ab = (n/W) · Σ_ij w_ij (a_i−ā)(b_j−b̄)
                      / sqrt(Σ(a_i−ā)² · Σ(b_j−b̄)²)

    over the FIXED lattice (empty cells 0, queen 3x3-minus-self
    weights, lon wrapped — the :func:`morans_i` machinery). Both class
    counts come from ONE corpus pass (conditional sums); the cross pair
    term pab = Σ w_ij a_i b_j scatters the A-counts onto neighbors and
    joins the PRESENT B-cells; all seven moments are BIGINT-exact and
    the statistic is one shared double expression. NULL when either
    class is spatially constant. Output: one row
    (n_cells, w_sum, sa, sb, ra, rb, pab, moran_ab).
    """
    nx, cy0, cy1, n_cells, w_sum = _moran_lattice(cell_deg, lat0, lat1)
    counts = _biv_counts_sql(
        src_sql, cell_deg, cy0, cy1, a_pred, b_pred, lon, lat
    )
    offs = ", ".join(
        f"({dx}, {dy})"
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)
        if not (dx == 0 and dy == 0)
    )
    rowsum = (
        f"(CASE WHEN cy = {cy0} OR cy = {cy1 - 1} THEN 5 ELSE 8 END)"
    )
    return (
        f"WITH counts AS ({counts}), "
        f"offs(dx, dy) AS (VALUES {offs}), "
        f"scat AS (SELECT ((c.cx + o.dx + {nx}) % {nx}) AS tx, "
        f"(c.cy + o.dy) AS ty, c.xa "
        f"FROM counts c CROSS JOIN offs o "
        f"WHERE (c.cy + o.dy) >= {cy0} AND (c.cy + o.dy) < {cy1}), "
        f"pair AS (SELECT CAST(coalesce(sum(s.xa * t.xb), 0) AS BIGINT) AS pab "
        f"FROM scat s JOIN counts t ON s.tx = t.cx AND s.ty = t.cy), "
        f"mom AS (SELECT CAST(sum(xa) AS BIGINT) AS sa, "
        f"CAST(sum(xa * xa) AS BIGINT) AS saa, "
        f"CAST(sum(xb) AS BIGINT) AS sb, "
        f"CAST(sum(xb * xb) AS BIGINT) AS sbb, "
        f"CAST(sum({rowsum} * xa) AS BIGINT) AS ra, "
        f"CAST(sum({rowsum} * xb) AS BIGINT) AS rb FROM counts) "
        f"SELECT CAST({n_cells} AS BIGINT) AS n_cells, "
        f"CAST({w_sum} AS BIGINT) AS w_sum, sa, sb, ra, rb, pab, "
        + _biv_out_sql(n_cells, w_sum)
        + " FROM mom CROSS JOIN pair"
    )


def bivariate_morans_i(
    df: DataFrame,
    cell_deg: float,
    lat0: float,
    lat1: float,
    a_pred: str,
    b_pred: str,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Bivariate Moran's I (see :func:`bivariate_morans_i_sql`). Plan:
    ONE corpus hash-aggregate (both class counts as conditional sums),
    the bounded 8-offset Generate, one CELL-sized join for the cross
    pair term, 1-row aggregates — the scatter, pair, and moment
    branches all reuse the one cell-count exchange."""
    nx, cy0, cy1, n_cells, w_sum = _moran_lattice(cell_deg, lat0, lat1)
    _, cx, cy = cell_id_sql(cell_deg, lon, lat)
    counts = (
        df.selectExpr(
            f"{cx} AS cx", f"{cy} AS cy",
            f"CASE WHEN {a_pred} THEN 1 ELSE 0 END AS ia",
            f"CASE WHEN {b_pred} THEN 1 ELSE 0 END AS ib",
        )
        .filter(f"cy >= {cy0} AND cy < {cy1}")
        .groupBy("cx", "cy")
        .agg(
            F.expr("CAST(sum(ia) AS BIGINT)").alias("xa"),
            F.expr("CAST(sum(ib) AS BIGINT)").alias("xb"),
        )
    )
    offs = ", ".join(
        f"struct({dx} AS dx, {dy} AS dy)"
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)
        if not (dx == 0 and dy == 0)
    )
    scat = counts.selectExpr(
        f"explode(array({offs})) AS o", "cx", "cy", "xa"
    ).selectExpr(
        f"((cx + o.dx + {nx}) % {nx}) AS tx", "(cy + o.dy) AS ty",
        "xa AS sxa",
    ).filter(f"ty >= {cy0} AND ty < {cy1}")
    pair = scat.join(
        counts, (scat.tx == counts.cx) & (scat.ty == counts.cy)
    ).agg(
        F.expr("CAST(coalesce(sum(sxa * xb), 0) AS BIGINT)").alias("pab")
    )
    rowsum = (
        f"(CASE WHEN cy = {cy0} OR cy = {cy1 - 1} THEN 5 ELSE 8 END)"
    )
    mom = counts.selectExpr("xa", "xb", f"{rowsum} AS rw").agg(
        F.expr("CAST(sum(xa) AS BIGINT)").alias("sa"),
        F.expr("CAST(sum(xa * xa) AS BIGINT)").alias("saa"),
        F.expr("CAST(sum(xb) AS BIGINT)").alias("sb"),
        F.expr("CAST(sum(xb * xb) AS BIGINT)").alias("sbb"),
        F.expr("CAST(sum(rw * xa) AS BIGINT)").alias("ra"),
        F.expr("CAST(sum(rw * xb) AS BIGINT)").alias("rb"),
    )
    return mom.crossJoin(F.broadcast(pair)).selectExpr(
        f"CAST({n_cells} AS BIGINT) AS n_cells",
        f"CAST({w_sum} AS BIGINT) AS w_sum",
        "sa", "sb", "ra", "rb", "pab",
        _biv_out_sql(n_cells, w_sum),
    )


# ---------------------------------------------- emerging hotspots --

def _gi_z_expr(
    n: str, nbr: str = "nbr_sum", w: str = "w_size",
    sx: str = "sx", sxx: str = "sxx",
) -> str:
    """The Gi* z closed form with the lattice size folded as the
    literal ``n`` and the four inputs as column expressions — ONE
    string shared verbatim by every consumer in both dialects."""
    return (
        f"round((CAST({nbr} AS DOUBLE) "
        f"- (CAST({sx} AS DOUBLE) / {n}) * CAST({w} AS DOUBLE)) "
        f"/ nullif(sqrt(CAST({sxx} AS DOUBLE) / {n} "
        f"- (CAST({sx} AS DOUBLE) / {n}) * (CAST({sx} AS DOUBLE) / {n})) "
        f"* sqrt(({n} * CAST({w} AS DOUBLE) "
        f"- CAST({w} AS DOUBLE) * CAST({w} AS DOUBLE)) "
        f"/ ({n} - 1.0E0)), 0.0E0), 6)"
    )


def _ehs_params(
    cell_deg: float, lat0: float, lat1: float,
    t0_us: int, bin_us: int, n_bins: int,
) -> tuple:
    """(nx, cy0, cy1, T, n_cells) with the emerging-hotspot guards
    shared by the trend and category surfaces."""
    nx, _, _ = _grid_params(cell_deg)
    _check_window_nx(nx, 1)
    cy0, cy1 = _lat_band(cell_deg, lat0, lat1)
    _mk_params(t0_us, bin_us, n_bins)
    T = int(n_bins)
    if cy1 - cy0 < 2:
        # a single lat row has window size 3, which the {6, 9}
        # default-z table cannot represent — same floor as
        # _moran_lattice
        raise ValueError(
            f"emerging hotspots needs at least 2 lat rows, got "
            f"{cy1 - cy0}"
        )
    return nx, cy0, cy1, T, nx * (cy1 - cy0)


def _ehs_chain_sql(
    src_sql: str, cell_deg: float, lat0: float, lat1: float,
    t0_us: int, bin_us: int, n_bins: int,
    ts_us: str, lon: str, lat: str,
) -> tuple:
    """(chain, T): the shared CTE chain (no WITH prefix) ending at the
    bounded z ``cube`` — per-(bin, cell) counts, per-bin exact global
    moments, the 9-offset scatter, present z's, active cells, per-cell
    event totals (``ev``), the T-row bin table, and the per-(bin, W)
    default-z zero-fill. Both the MK-trend surface and the category
    surface append their own tail CTEs to this one string, so the cube
    semantics cannot drift between them."""
    nx, cy0, cy1, T, n_cells = _ehs_params(
        cell_deg, lat0, lat1, t0_us, bin_us, n_bins,
    )
    n = f"{n_cells}.0E0"
    _, cx, cy = cell_id_sql(cell_deg, lon, lat)
    binx = _bin_sql(ts_us, t0_us, bin_us)
    offs = ", ".join(
        f"({dx}, {dy})" for dx in (-1, 0, 1) for dy in (-1, 0, 1)
    )
    bins = ", ".join(f"({b})" for b in range(T))
    wsize = (
        f"CAST(3 * (1 + (CASE WHEN ty - 1 >= {cy0} THEN 1 ELSE 0 END) "
        f"+ (CASE WHEN ty + 1 < {cy1} THEN 1 ELSE 0 END)) AS BIGINT)"
    )
    zx = _gi_z_expr(n)
    zx0 = _gi_z_expr(
        n, nbr="CAST(0 AS BIGINT)", w="ws.w_size", sx="g.sx", sxx="g.sxx"
    )
    chain = (
        # per-(bin, cell) counts over the study band
        f"c AS (SELECT {binx} AS b, {cx} AS cx, {cy} AS cy, "
        f"CAST(count(*) AS BIGINT) AS cnt FROM ({src_sql}) s "
        f"WHERE {cy} >= {cy0} AND {cy} < {cy1} GROUP BY 1, 2, 3), "
        f"cf AS (SELECT * FROM c WHERE b >= 0 AND b < {T}), "
        # per-bin exact global moments (empty cells are zeros: n fixed)
        f"gmom AS (SELECT b, CAST(sum(cnt) AS BIGINT) AS sx, "
        f"CAST(sum(cnt * cnt) AS BIGINT) AS sxx FROM cf GROUP BY b), "
        f"offs(dx, dy) AS (VALUES {offs}), "
        f"scat AS (SELECT cf.b, ((cf.cx + o.dx + {nx}) % {nx}) AS tx, "
        f"(cf.cy + o.dy) AS ty, cf.cnt FROM cf CROSS JOIN offs o "
        f"WHERE (cf.cy + o.dy) >= {cy0} AND (cf.cy + o.dy) < {cy1}), "
        f"win AS (SELECT b, tx, ty, CAST(sum(cnt) AS BIGINT) AS nbr_sum "
        f"FROM scat GROUP BY 1, 2, 3), "
        # present z's: windowed cells per bin
        f"zp AS (SELECT w.b, w.tx, w.ty, w.nbr_sum, {wsize} AS w_size, "
        f"g.sx, g.sxx FROM win w JOIN gmom g ON w.b = g.b), "
        f"zpz AS (SELECT b, tx, ty, {zx} AS z FROM zp), "
        # active cells + their per-cell event totals
        f"act AS (SELECT tx, ty FROM win GROUP BY tx, ty), "
        f"ev AS (SELECT cx AS tx, cy AS ty, "
        f"CAST(sum(cnt) AS BIGINT) AS n_events FROM cf GROUP BY 1, 2), "
        f"bins(b) AS (VALUES {bins}), "
        # default z per (bin, W): the all-empty-window constant
        # (nbr_sum = 0 inlined); bins with NO events (sx absent) or a
        # zero-variance bin yield NULL here and coalesce to 0 in cube
        f"zdef AS (SELECT bn.b, ws.w_size, {zx0} AS z "
        f"FROM bins bn CROSS JOIN "
        f"(SELECT CAST(6 AS BIGINT) AS w_size UNION ALL "
        f"SELECT CAST(9 AS BIGINT)) ws "
        f"LEFT JOIN gmom g ON g.b = bn.b), "
        # the bounded cube: active cells x T bins
        f"cube0 AS (SELECT a.tx, a.ty, bn.b, "
        f"(CASE WHEN a.ty = {cy0} OR a.ty = {cy1 - 1} "
        f"THEN 6 ELSE 9 END) AS wsz FROM act a CROSS JOIN bins bn), "
        f"cube AS (SELECT c0.tx, c0.ty, c0.b, "
        f"coalesce(zpz.z, zd.z, 0.0E0) AS z FROM cube0 c0 "
        f"LEFT JOIN zpz ON zpz.tx = c0.tx AND zpz.ty = c0.ty "
        f"AND zpz.b = c0.b "
        f"LEFT JOIN zdef zd ON zd.b = c0.b AND zd.w_size = c0.wsz)"
    )
    return chain, T


_EHS_MK_TAIL = (
    # Mann-Kendall over the full T-vector (pairwise; T <= 366)
    "mks AS (SELECT a.tx, a.ty, "
    "CAST(sum(CASE WHEN b2.z > a.z THEN 1 "
    "WHEN b2.z < a.z THEN -1 ELSE 0 END) AS BIGINT) AS mk_s "
    "FROM cube a JOIN cube b2 ON a.tx = b2.tx AND a.ty = b2.ty "
    "AND b2.b > a.b GROUP BY 1, 2), "
    "ties AS (SELECT tx, ty, "
    "CAST(sum(g * (g - 1) * (2 * g + 5)) AS BIGINT) AS tt_present "
    "FROM (SELECT tx, ty, z, CAST(count(*) AS BIGINT) AS g "
    "FROM cube GROUP BY 1, 2, 3) gg GROUP BY 1, 2)"
)


def emerging_hotspots_sql(
    src_sql: str,
    cell_deg: float,
    lat0: float,
    lat1: float,
    t0_us: int,
    bin_us: int,
    n_bins: int,
    ts_us: str = "ts_us",
    lon: str = "lon",
    lat: str = "lat",
) -> str:
    """Emerging hot spot analysis (the ArcGIS space-time-cube method):
    per-time-bin Getis-Ord Gi* z-scores on the FIXED study lattice,
    then a per-cell Mann-Kendall monotone-trend test over each active
    cell's T-long z series — "is this location becoming (or ceasing to
    be) a hotspot?".

    Exact zero-fill semantics WITHOUT materializing lattice × T: a
    (cell, bin) absent from the scatter has nbr_sum = 0, whose z is a
    per-(bin, W) CONSTANT (W ∈ {interior 9, lat-edge 6}); each ACTIVE
    cell (>= 1 windowed event anywhere in the period) joins a T-row
    VALUES bin table left-joined to its present z's and coalesces the
    default — so the cube is bounded by active_cells × T, and the MK
    pair join by active_cells × T². Gi* moments are BIGINT-exact per
    bin; S and tie sums integer; z comparisons run on the round(.,6)
    values both engines compute from identical expressions.

    Output per active cell: (cell_x, cell_y, n_events, mk_s, mk_z,
    trend) — trend in {'increasing','decreasing','none'} at two-sided
    5%.
    """
    chain, T = _ehs_chain_sql(
        src_sql, cell_deg, lat0, lat1, t0_us, bin_us, n_bins,
        ts_us, lon, lat,
    )
    return (
        f"WITH {chain}, {_EHS_MK_TAIL}, "
        f"m AS (SELECT mks.tx, mks.ty, mks.mk_s, ties.tt_present, "
        f"CAST({T} AS BIGINT) AS k_bins FROM mks "
        f"JOIN ties ON mks.tx = ties.tx AND mks.ty = ties.ty) "
        f"SELECT m.tx AS cell_x, m.ty AS cell_y, "
        f"CAST(coalesce(ev.n_events, 0) AS BIGINT) AS n_events, "
        f"m.mk_s, "
        + ", ".join(_mk_z_sql(T))
        + " FROM m LEFT JOIN ev ON ev.tx = m.tx AND ev.ty = m.ty"
    )

def _ehs_cube_frames(
    df: DataFrame,
    cell_deg: float, lat0: float, lat1: float,
    t0_us: int, bin_us: int, n_bins: int,
    ts_us: str, lon: str, lat: str,
) -> tuple:
    """(cube, ev, T): the Spark mirror of :func:`_ehs_chain_sql` —
    ONE corpus hash-aggregate to the (bin, cell) table; per-bin
    moments, the 9-offset scatter, and the active-cell/event tables
    all reuse that exchange; the T-row bin table and T×2-row default-z
    table BROADCAST."""
    nx, cy0, cy1, T, n_cells = _ehs_params(
        cell_deg, lat0, lat1, t0_us, bin_us, n_bins,
    )
    n = f"{n_cells}.0E0"
    _, cx, cy = cell_id_sql(cell_deg, lon, lat)
    binx = _bin_sql(ts_us, t0_us, bin_us)
    spark = df.sparkSession

    cf = (
        df.selectExpr(f"{binx} AS b", f"{cx} AS cx", f"{cy} AS cy")
        .filter(f"cy >= {cy0} AND cy < {cy1} AND b >= 0 AND b < {T}")
        .groupBy("b", "cx", "cy")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    gmom = cf.groupBy("b").agg(
        F.sum("cnt").cast("bigint").alias("sx"),
        F.sum(F.col("cnt") * F.col("cnt")).cast("bigint").alias("sxx"),
    )
    offs = ", ".join(
        f"struct({dx} AS dx, {dy} AS dy)"
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)
    )
    win = (
        cf.selectExpr(f"explode(array({offs})) AS o", "b", "cx", "cy", "cnt")
        .selectExpr(
            "b", f"((cx + o.dx + {nx}) % {nx}) AS tx",
            "(cy + o.dy) AS ty", "cnt",
        )
        .filter(f"ty >= {cy0} AND ty < {cy1}")
        .groupBy("b", "tx", "ty")
        .agg(F.sum("cnt").cast("bigint").alias("nbr_sum"))
    )
    wsize = (
        f"CAST(3 * (1 + (CASE WHEN ty - 1 >= {cy0} THEN 1 ELSE 0 END) "
        f"+ (CASE WHEN ty + 1 < {cy1} THEN 1 ELSE 0 END)) AS BIGINT)"
    )
    zx = _gi_z_expr(n)
    zpz = (
        win.join(F.broadcast(gmom), "b")
        .selectExpr("b", "tx", "ty", "nbr_sum", f"{wsize} AS w_size",
                    "sx", "sxx")
        .selectExpr("b", "tx", "ty", f"{zx} AS z")
    )
    act = win.select("tx", "ty").distinct()
    ev = cf.groupBy(
        F.col("cx").alias("tx"), F.col("cy").alias("ty")
    ).agg(F.sum("cnt").cast("bigint").alias("n_events"))
    bins = spark.range(T).selectExpr("CAST(id AS BIGINT) AS b")
    wtab = spark.range(2).selectExpr(
        "CAST(CASE WHEN id = 0 THEN 6 ELSE 9 END AS BIGINT) AS w_size"
    )
    zx0 = _gi_z_expr(
        n, nbr="CAST(0 AS BIGINT)", w="w_size", sx="sx", sxx="sxx"
    )
    zdef = (
        bins.crossJoin(wtab)
        .join(gmom, "b", "left")
        .selectExpr("b", "w_size", f"{zx0} AS z")
    )
    cube = (
        act.crossJoin(F.broadcast(bins))
        .selectExpr(
            "tx", "ty", "b",
            f"CAST(CASE WHEN ty = {cy0} OR ty = {cy1 - 1} "
            f"THEN 6 ELSE 9 END AS BIGINT) AS wsz",
        )
        .join(zpz, ["b", "tx", "ty"], "left")
        .join(
            F.broadcast(zdef.withColumnRenamed("w_size", "wsz")
                        .withColumnRenamed("z", "zd")),
            ["b", "wsz"], "left",
        )
        .selectExpr("tx", "ty", "b", "coalesce(z, zd, 0.0E0) AS z")
    )
    return cube, ev, T


def _ehs_mk_frames(cube: DataFrame) -> tuple:
    """(mks, ties): the per-cell Mann-Kendall S and tie sums over the
    z cube (pair join bounded by active_cells × T²)."""
    a = cube.selectExpr("tx", "ty", "b AS b1", "z AS z1")
    b2 = cube.selectExpr("tx AS tx2", "ty AS ty2", "b AS b2", "z AS z2")
    mks = (
        a.join(b2, (a.tx == b2.tx2) & (a.ty == b2.ty2) & (b2.b2 > a.b1))
        .groupBy("tx", "ty")
        .agg(F.expr(
            "CAST(sum(CASE WHEN z2 > z1 THEN 1 "
            "WHEN z2 < z1 THEN -1 ELSE 0 END) AS BIGINT)"
        ).alias("mk_s"))
    )
    ties = (
        cube.groupBy("tx", "ty", "z")
        .agg(F.count(F.lit(1)).cast("bigint").alias("g"))
        .groupBy("tx", "ty")
        .agg(F.expr(
            "CAST(sum(g * (g - 1) * (2 * g + 5)) AS BIGINT)"
        ).alias("tt_present"))
    )
    return mks, ties


def emerging_hotspots(
    df: DataFrame,
    cell_deg: float,
    lat0: float,
    lat1: float,
    t0_us: int,
    bin_us: int,
    n_bins: int,
    ts_us: str = "ts_us",
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Emerging hot spot analysis (see :func:`emerging_hotspots_sql`
    for the statistic). DataFrame plan: see :func:`_ehs_cube_frames`;
    the MK pair join is bounded by active_cells × T²."""
    cube, ev, T = _ehs_cube_frames(
        df, cell_deg, lat0, lat1, t0_us, bin_us, n_bins,
        ts_us, lon, lat,
    )
    mks, ties = _ehs_mk_frames(cube)
    m = (
        mks.join(ties, ["tx", "ty"])
        .join(ev, ["tx", "ty"], "left")
        .selectExpr(
            "tx", "ty",
            "CAST(coalesce(n_events, 0) AS BIGINT) AS n_events",
            "mk_s", "tt_present",
            f"CAST({T} AS BIGINT) AS k_bins",
        )
    )
    return m.selectExpr(
        "tx AS cell_x", "ty AS cell_y", "n_events", "mk_s",
        *_mk_z_sql(T),
    )


def _ehs_category_case(T: int) -> str:
    """The ESRI-style emerging-hotspot taxonomy as ONE shared CASE
    ladder over (nh, nc, last_hot, last_cold, frh, frc, trend) — hot
    categories first, then the cold mirror, first match wins.
    p90 = ceil(0.9·T) is the ArcGIS "90 percent of time steps"
    threshold; 'new' = significant only in the final bin;
    'consecutive' = one uninterrupted final run, never before;
    'intensifying'/'persistent'/'diminishing' = ≥90% of bins with
    rising / no / falling MK trend of the z series; 'oscillating' =
    final hot with cold history (or mirror); 'sporadic' = final hot,
    on-and-off, never the opposite; 'historical' = ≥90% but not in the
    final bin."""
    p90 = math.ceil(0.9 * T)
    return (
        f"(CASE "
        f"WHEN last_hot = 1 AND nh = 1 THEN 'new hot spot' "
        f"WHEN last_hot = 1 AND nh = frh AND nh < {p90} "
        f"THEN 'consecutive hot spot' "
        f"WHEN nh >= {p90} AND last_hot = 1 AND trend = 'increasing' "
        f"THEN 'intensifying hot spot' "
        f"WHEN nh >= {p90} AND last_hot = 0 THEN 'historical hot spot' "
        f"WHEN nh >= {p90} AND trend = 'decreasing' "
        f"THEN 'diminishing hot spot' "
        f"WHEN nh >= {p90} THEN 'persistent hot spot' "
        f"WHEN last_hot = 1 AND nc > 0 THEN 'oscillating hot spot' "
        f"WHEN last_hot = 1 THEN 'sporadic hot spot' "
        f"WHEN last_cold = 1 AND nc = 1 THEN 'new cold spot' "
        f"WHEN last_cold = 1 AND nc = frc AND nc < {p90} "
        f"THEN 'consecutive cold spot' "
        f"WHEN nc >= {p90} AND last_cold = 1 AND trend = 'decreasing' "
        f"THEN 'intensifying cold spot' "
        f"WHEN nc >= {p90} AND last_cold = 0 THEN 'historical cold spot' "
        f"WHEN nc >= {p90} AND trend = 'increasing' "
        f"THEN 'diminishing cold spot' "
        f"WHEN nc >= {p90} THEN 'persistent cold spot' "
        f"WHEN last_cold = 1 AND nh > 0 THEN 'oscillating cold spot' "
        f"WHEN last_cold = 1 THEN 'sporadic cold spot' "
        f"ELSE 'no pattern' END)"
    )


_EHS_FLAG_AGGS = (
    ("CAST(sum(hot) AS BIGINT)", "nh"),
    ("CAST(sum(cold) AS BIGINT)", "nc"),
    ("CAST(max(CASE WHEN b = {last} THEN hot ELSE 0 END) AS BIGINT)",
     "last_hot"),
    ("CAST(max(CASE WHEN b = {last} THEN cold ELSE 0 END) AS BIGINT)",
     "last_cold"),
    ("CAST(max(CASE WHEN hot = 0 THEN b ELSE -1 END) AS BIGINT)",
     "lnh"),
    ("CAST(max(CASE WHEN cold = 0 THEN b ELSE -1 END) AS BIGINT)",
     "lnc"),
)


def emerging_hotspot_categories_sql(
    src_sql: str,
    cell_deg: float,
    lat0: float,
    lat1: float,
    t0_us: int,
    bin_us: int,
    n_bins: int,
    ts_us: str = "ts_us",
    lon: str = "lon",
    lat: str = "lat",
) -> str:
    """The full ArcGIS emerging-hot-spot CLASSIFICATION on top of the
    :func:`emerging_hotspots_sql` cube: per-(cell, bin) hot/cold flags
    (|z| >= 1.96 on the shared round(.,6) Gi* z), per-cell run/count
    aggregates, the MK z-trend, and the 17-label taxonomy of
    :func:`_ehs_category_case` (8 hot + 8 cold + 'no pattern').

    Output per active cell: (cell_x, cell_y, n_events, n_hot, n_cold,
    final_hot_run, final_cold_run, mk_z, trend, category)."""
    chain, T = _ehs_chain_sql(
        src_sql, cell_deg, lat0, lat1, t0_us, bin_us, n_bins,
        ts_us, lon, lat,
    )
    aggs = ", ".join(
        f"{expr.format(last=T - 1)} AS {name}"
        for expr, name in _EHS_FLAG_AGGS
    )
    return (
        f"WITH {chain}, {_EHS_MK_TAIL}, "
        f"flags AS (SELECT tx, ty, b, "
        f"(CASE WHEN z >= 1.96E0 THEN 1 ELSE 0 END) AS hot, "
        f"(CASE WHEN z <= -1.96E0 THEN 1 ELSE 0 END) AS cold "
        f"FROM cube), "
        f"fa AS (SELECT tx, ty, {aggs} FROM flags GROUP BY 1, 2), "
        f"st AS (SELECT fa.tx, fa.ty, fa.nh, fa.nc, fa.last_hot, "
        f"fa.last_cold, CAST({T - 1} AS BIGINT) - fa.lnh AS frh, "
        f"CAST({T - 1} AS BIGINT) - fa.lnc AS frc, "
        f"mks.mk_s, ties.tt_present, CAST({T} AS BIGINT) AS k_bins "
        f"FROM fa JOIN mks ON fa.tx = mks.tx AND fa.ty = mks.ty "
        f"JOIN ties ON fa.tx = ties.tx AND fa.ty = ties.ty), "
        f"tr AS (SELECT tx, ty, nh, nc, last_hot, last_cold, frh, frc, "
        + ", ".join(_mk_z_sql(T))
        + f" FROM st) "
        f"SELECT tr.tx AS cell_x, tr.ty AS cell_y, "
        f"CAST(coalesce(ev.n_events, 0) AS BIGINT) AS n_events, "
        f"tr.nh AS n_hot, tr.nc AS n_cold, "
        f"tr.frh AS final_hot_run, tr.frc AS final_cold_run, "
        f"tr.mk_z, tr.trend, "
        + _ehs_category_case(T)
        + " AS category "
        f"FROM tr LEFT JOIN ev ON ev.tx = tr.tx AND ev.ty = tr.ty"
    )


def emerging_hotspot_categories(
    df: DataFrame,
    cell_deg: float,
    lat0: float,
    lat1: float,
    t0_us: int,
    bin_us: int,
    n_bins: int,
    ts_us: str = "ts_us",
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """ESRI emerging-hotspot categories (see
    :func:`emerging_hotspot_categories_sql`). Plan: the shared cube
    frames plus ONE extra cell-grain aggregation for the flag
    run/counts — everything downstream of the corpus aggregate is
    bounded by active_cells × T."""
    cube, ev, T = _ehs_cube_frames(
        df, cell_deg, lat0, lat1, t0_us, bin_us, n_bins,
        ts_us, lon, lat,
    )
    mks, ties = _ehs_mk_frames(cube)
    flags = cube.selectExpr(
        "tx", "ty", "b",
        "(CASE WHEN z >= 1.96E0 THEN 1 ELSE 0 END) AS hot",
        "(CASE WHEN z <= -1.96E0 THEN 1 ELSE 0 END) AS cold",
    )
    fa = flags.groupBy("tx", "ty").agg(*[
        F.expr(expr.format(last=T - 1)).alias(name)
        for expr, name in _EHS_FLAG_AGGS
    ])
    st = (
        fa.join(mks, ["tx", "ty"])
        .join(ties, ["tx", "ty"])
        .selectExpr(
            "tx", "ty", "nh", "nc", "last_hot", "last_cold",
            f"CAST({T - 1} AS BIGINT) - lnh AS frh",
            f"CAST({T - 1} AS BIGINT) - lnc AS frc",
            "mk_s", "tt_present",
            f"CAST({T} AS BIGINT) AS k_bins",
        )
    )
    tr = st.selectExpr(
        "tx", "ty", "nh", "nc", "last_hot", "last_cold", "frh", "frc",
        *_mk_z_sql(T),
    )
    return (
        tr.join(ev, ["tx", "ty"], "left")
        .selectExpr(
            "tx AS cell_x", "ty AS cell_y",
            "CAST(coalesce(n_events, 0) AS BIGINT) AS n_events",
            "nh AS n_hot", "nc AS n_cold",
            "frh AS final_hot_run", "frc AS final_cold_run",
            "mk_z", "trend",
            _ehs_category_case(T) + " AS category",
        )
    )


# ------------------------------------------------ local Moran (LISA) --

def local_morans_i_sql(
    src_sql: str,
    cell_deg: float,
    lat0: float,
    lat1: float,
    lon: str = "lon",
    lat: str = "lat",
) -> str:
    """Anselin's Local Moran's I (LISA, 1995) per lattice cell — the
    local decomposition of :func:`morans_i` (Σ_i I_i ∝ global I):

        I_i = (n / Σ_k (x_k−m)²) · (x_i−m) · Σ_j w_ij (x_j−m)

    binary 3x3-minus-self weights over the FIXED lattice (empty cells
    x=0, lon wrapped, lat clipped). The neighbor term expands exactly:
    Σ_j w_ij (x_j−m) = nbr_sum_i − rowsum_i·m with nbr_sum the
    8-neighbor count sum (BIGINT) and rowsum ∈ {5, 8} closed-form from
    the lat row — so I_i is one shared double expression over exact
    integers. Each cell also gets its quadrant label (HH/LL/HL/LH —
    high/low value × high/low neighborhood, the LISA cluster map).

    Output: cells with >= 1 event in the 3x3 window —
    (cell_x, cell_y, cnt, nbr_sum, lisa_i, quadrant); lisa_i NULL for a
    constant surface. (All-empty-window cells carry the same constant
    I and are noise, exactly like the Gi* output contract.)
    """
    moments, n_cells, w_sum = _moran_moments_sql(
        src_sql, cell_deg, lat0, lat1, lon, lat,
    )
    nx, _, _ = _grid_params(cell_deg)
    cy0, cy1 = _lat_band(cell_deg, lat0, lat1)
    counts = _counts_sql(src_sql, cell_deg, cy0, cy1, lon, lat)
    offs = ", ".join(
        f"({dx}, {dy})"
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)
        if not (dx == 0 and dy == 0)
    )
    n = f"{n_cells}.0E0"
    m = f"(CAST(sx AS DOUBLE) / {n})"
    rowsum = (
        f"(CASE WHEN coalesce(w.ty, c.cy) = {cy0} "
        f"OR coalesce(w.ty, c.cy) = {cy1 - 1} THEN 5.0E0 "
        f"ELSE 8.0E0 END)"
    )
    dev = f"(CAST(coalesce(c.cnt, 0) AS DOUBLE) - {m})"
    lag = f"(CAST(coalesce(w.nbr_sum, 0) AS DOUBLE) - {rowsum} * {m})"
    den = f"(CAST(sxx AS DOUBLE) - {n} * {m} * {m})"
    return (
        f"WITH counts AS ({counts}), "
        f"offs(dx, dy) AS (VALUES {offs}), "
        f"scat AS (SELECT ((cc.cx + o.dx + {nx}) % {nx}) AS tx, "
        f"(cc.cy + o.dy) AS ty, cc.cnt "
        f"FROM counts cc CROSS JOIN offs o "
        f"WHERE (cc.cy + o.dy) >= {cy0} AND (cc.cy + o.dy) < {cy1}), "
        f"win AS (SELECT tx, ty, CAST(sum(cnt) AS BIGINT) AS nbr_sum "
        f"FROM scat GROUP BY tx, ty), "
        f"mm AS ({moments}) "
        f"SELECT coalesce(w.tx, c.cx) AS cell_x, "
        f"coalesce(w.ty, c.cy) AS cell_y, "
        f"CAST(coalesce(c.cnt, 0) AS BIGINT) AS cnt, "
        f"CAST(coalesce(w.nbr_sum, 0) AS BIGINT) AS nbr_sum, "
        f"round({n} / nullif({den}, 0.0E0) * {dev} * {lag}, 6) "
        f"AS lisa_i, "
        f"(CASE WHEN {dev} >= 0.0E0 AND {lag} >= 0.0E0 THEN 'HH' "
        f"WHEN {dev} < 0.0E0 AND {lag} < 0.0E0 THEN 'LL' "
        f"WHEN {dev} >= 0.0E0 THEN 'HL' ELSE 'LH' END) AS quadrant "
        f"FROM win w FULL OUTER JOIN counts c "
        f"ON c.cx = w.tx AND c.cy = w.ty CROSS JOIN mm"
    )


def local_morans_i(
    df: DataFrame,
    cell_deg: float,
    lat0: float,
    lat1: float,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Local Moran's I (see :func:`local_morans_i_sql`). Plan: the
    :func:`morans_i` shape — one corpus hash-aggregate, the bounded
    8-offset scatter (reusing the cell exchange), a cell-sized left
    join back to the counts, and the broadcast 1-row moment table."""
    nx, cy0, cy1, n_cells, _ = _moran_lattice(cell_deg, lat0, lat1)
    _, cx, cy = cell_id_sql(cell_deg, lon, lat)
    counts = (
        df.selectExpr(f"{cx} AS cx", f"{cy} AS cy")
        .filter(f"cy >= {cy0} AND cy < {cy1}")
        .groupBy("cx", "cy")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    mom = counts.agg(
        F.sum("cnt").cast("bigint").alias("sx"),
        F.sum(F.col("cnt") * F.col("cnt")).cast("bigint").alias("sxx"),
    )
    offs = ", ".join(
        f"struct({dx} AS dx, {dy} AS dy)"
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)
        if not (dx == 0 and dy == 0)
    )
    win = (
        counts.selectExpr(f"explode(array({offs})) AS o", "cx", "cy", "cnt")
        .selectExpr(
            f"((cx + o.dx + {nx}) % {nx}) AS tx", "(cy + o.dy) AS ty",
            "cnt",
        )
        .filter(f"ty >= {cy0} AND ty < {cy1}")
        .groupBy("tx", "ty")
        .agg(F.sum("cnt").cast("bigint").alias("nbr_sum"))
    )
    n = f"{n_cells}.0E0"
    m = f"(CAST(sx AS DOUBLE) / {n})"
    rowsum = (
        f"(CASE WHEN ty = {cy0} OR ty = {cy1 - 1} THEN 5.0E0 "
        f"ELSE 8.0E0 END)"
    )
    dev = f"(CAST(cnt AS DOUBLE) - {m})"
    lag = f"(CAST(nbr_sum AS DOUBLE) - {rowsum} * {m})"
    den = f"(CAST(sxx AS DOUBLE) - {n} * {m} * {m})"
    joined = (
        win.join(
            counts,
            (win.tx == counts.cx) & (win.ty == counts.cy),
            "full_outer",
        )
        .crossJoin(F.broadcast(mom))
        .selectExpr(
            "coalesce(tx, cx) AS tx", "coalesce(ty, cy) AS ty",
            "CAST(coalesce(cnt, 0) AS BIGINT) AS cnt",
            "CAST(coalesce(nbr_sum, 0) AS BIGINT) AS nbr_sum",
            "sx", "sxx",
        )
    )
    return joined.selectExpr(
        "tx AS cell_x", "ty AS cell_y", "cnt", "nbr_sum",
        f"round({n} / nullif({den}, 0.0E0) * {dev} * {lag}, 6) "
        f"AS lisa_i",
        f"(CASE WHEN {dev} >= 0.0E0 AND {lag} >= 0.0E0 THEN 'HH' "
        f"WHEN {dev} < 0.0E0 AND {lag} < 0.0E0 THEN 'LL' "
        f"WHEN {dev} >= 0.0E0 THEN 'HL' ELSE 'LH' END) AS quadrant",
    )


# ------------------------------------------- focal field statistics --

#: fixed-point scale for field values entering window sums: 1e6 keeps
#: the scatter-sum exact BIGINT to ~4.6e6 value-units x 1e6 events
#: under one window — HALF the raw int64 range, because the exact
#: half-up mean computes 2*vs + n (document the bound per deployment;
#: raise/lower to trade resolution for headroom)
_VAL_SCALE = 1_000_000


def _int_mean_sql(vs: str, n: str) -> str:
    """Exact fixed-point mean: round-half-up(vs/n) computed ENTIRELY in
    BIGINT (floor((2·vs + n)/(2·n)) via the pmod pattern), then ONE
    exact double division by the value scale. The naive
    round(vs/1e6/n, 6) hits the half-ulp boundary when vs/n lands
    exactly on x.5 at the 6th decimal — Spark (shortest-decimal
    BigDecimal) and DuckDB (scaled nearbyint) then round the SAME
    double differently (observed live at sf0.1). Integer rounding has
    no double anywhere, so both engines are bit-identical by
    construction; halves round toward +inf (engine-defined,
    documented)."""
    num = f"(2 * ({vs}) + ({n}))"
    den = f"(2 * ({n}))"
    q = (
        f"CAST((({num}) - ((({num}) % ({den}) + ({den})) % ({den}))) "
        f"/ ({den}) AS BIGINT)"
    )
    return (
        f"(CAST({q} AS DOUBLE) / {_VAL_SCALE}.0E0)"
    )


def focal_value_mean_sql(
    src_sql: str,
    value: str,
    cell_deg: float,
    lat0: float,
    lat1: float,
    lon: str = "lon",
    lat: str = "lat",
) -> str:
    """Focal (3x3-window) statistics of a MEASURED FIELD — the
    neighborhood smoothing every field-centric workflow runs (the
    count-based KDE's sibling for `value` columns: station averages,
    sensor readings). Per target cell over the wrapped/clipped window:
    event count, window mean, and the cell's own mean. NULL values
    are EXCLUDED up front (they carry no measurement — counting them
    would silently deflate the means).

    Exactness: values quantize to BIGINT at 1e-6 units
    (:data:`_VAL_SCALE`) BEFORE any sum, so cell and window sums are
    exact integer arithmetic — order-independent across engines and
    partitionings (the sum(double) trap); the two means are single
    double divisions, round(.,6). ONE corpus aggregation to the cell
    table; the bounded 9-offset scatter carries (count, value-sum)
    pairs. Output: (cell_x, cell_y, n_cell, n_window, cell_mean,
    window_mean) for cells with >= 1 windowed event.
    """
    nx, _, _ = _grid_params(cell_deg)
    _check_window_nx(nx, 1)
    cy0, cy1 = _lat_band(cell_deg, lat0, lat1)
    _, cx, cy = cell_id_sql(cell_deg, lon, lat)
    offs = ", ".join(
        f"({dx}, {dy})" for dx in (-1, 0, 1) for dy in (-1, 0, 1)
    )
    q = (
        f"CAST(round(({value}) * {_VAL_SCALE}.0E0, 0) AS BIGINT)"
    )
    return (
        f"WITH c AS (SELECT {cx} AS cx, {cy} AS cy, "
        f"CAST(count(*) AS BIGINT) AS n, "
        f"CAST(sum({q}) AS BIGINT) AS vs FROM ({src_sql}) s "
        f"WHERE {cy} >= {cy0} AND {cy} < {cy1} "
        f"AND ({value}) IS NOT NULL GROUP BY 1, 2), "
        f"offs(dx, dy) AS (VALUES {offs}), "
        f"scat AS (SELECT ((c.cx + o.dx + {nx}) % {nx}) AS tx, "
        f"(c.cy + o.dy) AS ty, c.n, c.vs "
        f"FROM c CROSS JOIN offs o "
        f"WHERE (c.cy + o.dy) >= {cy0} AND (c.cy + o.dy) < {cy1}), "
        f"win AS (SELECT tx, ty, CAST(sum(n) AS BIGINT) AS n_window, "
        f"CAST(sum(vs) AS BIGINT) AS vs_window "
        f"FROM scat GROUP BY tx, ty) "
        f"SELECT w.tx AS cell_x, w.ty AS cell_y, "
        f"CAST(coalesce(c.n, 0) AS BIGINT) AS n_cell, w.n_window, "
        f"(CASE WHEN c.n >= 1 THEN "
        + _int_mean_sql("c.vs", "c.n")
        + f" END) AS cell_mean, "
        f"(CASE WHEN w.n_window >= 1 THEN "
        + _int_mean_sql("w.vs_window", "w.n_window")
        + f" END) AS window_mean "
        f"FROM win w LEFT JOIN c ON c.cx = w.tx AND c.cy = w.ty"
    )


def focal_value_mean(
    df: DataFrame,
    value: str,
    cell_deg: float,
    lat0: float,
    lat1: float,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Focal field mean (see :func:`focal_value_mean_sql`). One corpus
    hash-aggregate; the scatter and the left join back to the cell
    table reuse its exchange."""
    nx, _, _ = _grid_params(cell_deg)
    _check_window_nx(nx, 1)
    cy0, cy1 = _lat_band(cell_deg, lat0, lat1)
    _, cx, cy = cell_id_sql(cell_deg, lon, lat)
    q = f"CAST(round(({value}) * {_VAL_SCALE}.0E0, 0) AS BIGINT)"
    c = (
        df.filter(f"({value}) IS NOT NULL")
        .selectExpr(f"{cx} AS cx", f"{cy} AS cy", f"{q} AS qv")
        .filter(f"cy >= {cy0} AND cy < {cy1}")
        .groupBy("cx", "cy")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("qv").cast("bigint").alias("vs"),
        )
    )
    offs = ", ".join(
        f"struct({dx} AS dx, {dy} AS dy)"
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)
    )
    win = (
        c.selectExpr(f"explode(array({offs})) AS o", "cx", "cy", "n", "vs")
        .selectExpr(
            f"((cx + o.dx + {nx}) % {nx}) AS tx", "(cy + o.dy) AS ty",
            "n", "vs",
        )
        .filter(f"ty >= {cy0} AND ty < {cy1}")
        .groupBy("tx", "ty")
        .agg(
            F.sum("n").cast("bigint").alias("n_window"),
            F.sum("vs").cast("bigint").alias("vs_window"),
        )
    )
    return (
        win.join(c, (win.tx == c.cx) & (win.ty == c.cy), "left")
        .selectExpr(
            "tx AS cell_x", "ty AS cell_y",
            "CAST(coalesce(n, 0) AS BIGINT) AS n_cell", "n_window",
            "(CASE WHEN n >= 1 THEN "
            + _int_mean_sql("vs", "n") + " END) AS cell_mean",
            "(CASE WHEN n_window >= 1 THEN "
            + _int_mean_sql("vs_window", "n_window")
            + " END) AS window_mean",
        )
    )


# -------------------------------------------- quadrat CSR test --

def _quadrat_out_sql(n_cells: int) -> tuple:
    """Shared projection over the exact moments (sx, sxx): chi² =
    (n·Σx² − (Σx)²)/Σx (the quadrat dispersion statistic), the
    variance-mean ratio chi²/(n−1), the normal-approx z =
    (chi² − (n−1))/√(2(n−1)), and the 5% two-sided pattern label."""
    n = f"{n_cells}.0E0"
    chi2 = (
        f"(({n} * CAST(sxx AS DOUBLE) "
        f"- CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) "
        f"/ nullif(CAST(sx AS DOUBLE), 0.0E0))"
    )
    dfree = f"({n} - 1.0E0)"
    z = f"(({chi2} - {dfree}) / sqrt(2.0E0 * {dfree}))"
    return (
        f"round({chi2}, 6) AS chi2",
        f"round({chi2} / {dfree}, 6) AS vmr",
        f"round({z}, 6) AS z",
        f"(CASE WHEN {z} >= 1.96E0 THEN 'clustered' "
        f"WHEN {z} <= -1.96E0 THEN 'dispersed' "
        f"ELSE 'random' END) AS pattern",
    )


def quadrat_csr_sql(
    src_sql: str,
    cell_deg: float,
    lat0: float,
    lat1: float,
    lon: str = "lon",
    lat: str = "lat",
) -> str:
    """Quadrat test of complete spatial randomness (the classic
    point-pattern first check; Greig-Smith / Fisher dispersion index):
    chi² = Σ_i (x_i − m)²/m over the FIXED lattice (empty cells x = 0)
    reduces EXACTLY to (n·Σx² − (Σx)²)/Σx — two BIGINT moments from one
    corpus pass, one closed-form double. Also reports the variance-mean
    ratio (VMR > 1 clustered, < 1 dispersed/regular) and the normal
    approximation z with a two-sided 5% pattern label. Output: one row
    (n_cells, n_events, chi2, vmr, z, pattern); chi2 NULL for an empty
    study band."""
    nx, _, _ = _grid_params(cell_deg)
    cy0, cy1 = _lat_band(cell_deg, lat0, lat1)
    n_cells = nx * (cy1 - cy0)
    if n_cells < 2:
        raise ValueError("study lattice needs at least 2 cells")
    counts = _counts_sql(src_sql, cell_deg, cy0, cy1, lon, lat)
    return (
        f"WITH counts AS ({counts}), "
        f"mom AS (SELECT CAST(coalesce(sum(cnt), 0) AS BIGINT) AS sx, "
        f"CAST(coalesce(sum(cnt * cnt), 0) AS BIGINT) AS sxx "
        f"FROM counts) "
        f"SELECT CAST({n_cells} AS BIGINT) AS n_cells, "
        f"sx AS n_events, "
        + ", ".join(_quadrat_out_sql(n_cells))
        + " FROM mom"
    )


def quadrat_csr(
    df: DataFrame,
    cell_deg: float,
    lat0: float,
    lat1: float,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Quadrat CSR test (see :func:`quadrat_csr_sql`): one corpus
    hash-aggregate, one 1-row gather — nothing else."""
    nx, _, _ = _grid_params(cell_deg)
    cy0, cy1 = _lat_band(cell_deg, lat0, lat1)
    n_cells = nx * (cy1 - cy0)
    if n_cells < 2:
        raise ValueError("study lattice needs at least 2 cells")
    _, cx, cy = cell_id_sql(cell_deg, lon, lat)
    counts = (
        df.selectExpr(f"{cx} AS cx", f"{cy} AS cy")
        .filter(f"cy >= {cy0} AND cy < {cy1}")
        .groupBy("cx", "cy")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    mom = counts.agg(
        F.expr("CAST(coalesce(sum(cnt), 0) AS BIGINT)").alias("sx"),
        F.expr("CAST(coalesce(sum(cnt * cnt), 0) AS BIGINT)").alias("sxx"),
    )
    return mom.selectExpr(
        f"CAST({n_cells} AS BIGINT) AS n_cells",
        "sx AS n_events",
        *_quadrat_out_sql(n_cells),
    )


# ------------------------------------------------------ Geary's C --

def _geary_out_sql(n_cells: int, w_sum: int) -> tuple:
    """Shared projection over (sx, sxx, rsum2, psum): Geary's C, its
    normal-approximation z, and the 5% two-sided pattern label.

    With binary symmetric 3x3-minus-self weights the numerator
    Σ_ij w_ij (x_i − x_j)² expands EXACTLY to 2·(rsum2 − psum) where
    rsum2 = Σ_i rowsum_i·x_i² (BIGINT) and psum is the Moran pair sum,
    so

        C = (n−1)·(rsum2 − psum) / (W·(sxx − n·m²)),   m = sx/n.

    Normality variance (Cliff & Ord 1981):
    Var(C) = ((2S1 + S2)(n−1) − 4W²) / (2(n+1)W²) with S1 = 2W (binary
    symmetric) and S2 = 4·Σ_i rowsum_i² — all compile-time lattice
    constants. z = (C − 1)/√Var; C < 1 (z < 0) means neighboring cells
    are SIMILAR (clustering), C > 1 dispersion — the sign convention is
    opposite to Moran's I."""
    n = f"{n_cells}.0E0"
    w = f"{w_sum}.0E0"
    m = f"(CAST(sx AS DOUBLE) / {n})"
    c = (
        f"(({n} - 1.0E0) "
        f"* (CAST(rsum2 AS DOUBLE) - CAST(psum AS DOUBLE)) "
        f"/ nullif({w} * (CAST(sxx AS DOUBLE) - {n} * {m} * {m}), "
        f"0.0E0))"
    )
    return c


def gearys_c_sql(
    src_sql: str,
    cell_deg: float,
    lat0: float,
    lat1: float,
    lon: str = "lon",
    lat: str = "lat",
) -> str:
    """Global Geary's C of the event-count surface (Geary 1954) — the
    pair-difference complement of :func:`morans_i` (Moran is a
    cross-product statistic, Geary a squared-difference one; C is more
    sensitive to local differences). Same FIXED lattice, binary
    3x3-minus-self wrapped weights, empty cells x = 0. One extra exact
    BIGINT moment beyond Moran's: rsum2 = Σ rowsum_i·x_i².

    Output: one row (n_cells, w_sum, sx, rsum2, psum, gearys_c, z,
    pattern); gearys_c NULL for a constant surface; floats round(.,6).
    """
    nx, cy0, cy1, n_cells, w_sum = _moran_lattice(cell_deg, lat0, lat1)
    s2 = 4 * nx * (2 * 25 + (cy1 - cy0 - 2) * 64)
    offs = ", ".join(
        f"({dx}, {dy})"
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)
        if not (dx == 0 and dy == 0)
    )
    counts = _counts_sql(src_sql, cell_deg, cy0, cy1, lon, lat)
    rowsum = (
        f"(CASE WHEN cy = {cy0} OR cy = {cy1 - 1} THEN 5 ELSE 8 END)"
    )
    var_c = (
        (2.0 * (2 * w_sum) + s2) * (n_cells - 1) - 4.0 * w_sum * w_sum
    ) / (2.0 * (n_cells + 1) * w_sum * w_sum)
    c = _geary_out_sql(n_cells, w_sum)
    z = f"(({c} - 1.0E0) / {_pf(math.sqrt(var_c))})"
    return (
        f"WITH counts AS ({counts}), "
        f"offs(dx, dy) AS (VALUES {offs}), "
        f"scat AS (SELECT ((c.cx + o.dx + {nx}) % {nx}) AS tx, "
        f"(c.cy + o.dy) AS ty, c.cnt "
        f"FROM counts c CROSS JOIN offs o "
        f"WHERE (c.cy + o.dy) >= {cy0} AND (c.cy + o.dy) < {cy1}), "
        f"pair AS (SELECT CAST(coalesce(sum(s.cnt * t.cnt), 0) "
        f"AS BIGINT) AS psum "
        f"FROM scat s JOIN counts t ON s.tx = t.cx AND s.ty = t.cy), "
        f"mom AS (SELECT CAST(coalesce(sum(cnt), 0) AS BIGINT) AS sx, "
        f"CAST(coalesce(sum(cnt * cnt), 0) AS BIGINT) AS sxx, "
        f"CAST(coalesce(sum({rowsum} * cnt * cnt), 0) AS BIGINT) "
        f"AS rsum2 FROM counts) "
        f"SELECT CAST({n_cells} AS BIGINT) AS n_cells, "
        f"CAST({w_sum} AS BIGINT) AS w_sum, sx, rsum2, psum, "
        f"round({c}, 6) AS gearys_c, "
        f"round({z}, 6) AS z, "
        f"(CASE WHEN {z} <= -1.96E0 THEN 'clustered' "
        f"WHEN {z} >= 1.96E0 THEN 'dispersed' "
        f"ELSE 'random' END) AS pattern "
        f"FROM mom CROSS JOIN pair"
    )


def gearys_c(
    df: DataFrame,
    cell_deg: float,
    lat0: float,
    lat1: float,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Global Geary's C (see :func:`gearys_c_sql`). Plan: identical to
    :func:`morans_i` — ONE corpus hash-aggregate to the cell table, the
    bounded 8-offset Generate, one cell-sized pair join, 1-row
    broadcast-combined aggregates. The corpus is scanned once."""
    nx, cy0, cy1, n_cells, w_sum = _moran_lattice(cell_deg, lat0, lat1)
    s2 = 4 * nx * (2 * 25 + (cy1 - cy0 - 2) * 64)
    _, cx, cy = cell_id_sql(cell_deg, lon, lat)
    counts = (
        df.selectExpr(f"{cx} AS cx", f"{cy} AS cy")
        .filter(f"cy >= {cy0} AND cy < {cy1}")
        .groupBy("cx", "cy")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    offs = ", ".join(
        f"struct({dx} AS dx, {dy} AS dy)"
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)
        if not (dx == 0 and dy == 0)
    )
    scat = counts.selectExpr(
        f"explode(array({offs})) AS o", "cx", "cy", "cnt"
    ).selectExpr(
        f"((cx + o.dx + {nx}) % {nx}) AS tx", "(cy + o.dy) AS ty",
        "cnt AS scnt",
    ).filter(f"ty >= {cy0} AND ty < {cy1}")
    pair = scat.join(
        counts, (scat.tx == counts.cx) & (scat.ty == counts.cy)
    ).agg(
        F.expr(
            "CAST(coalesce(sum(scnt * cnt), 0) AS BIGINT)"
        ).alias("psum")
    )
    rowsum = (
        f"(CASE WHEN cy = {cy0} OR cy = {cy1 - 1} THEN 5 ELSE 8 END)"
    )
    mom = counts.agg(
        F.expr("CAST(coalesce(sum(cnt), 0) AS BIGINT)").alias("sx"),
        F.expr("CAST(coalesce(sum(cnt * cnt), 0) AS BIGINT)").alias(
            "sxx"
        ),
        F.expr(
            f"CAST(coalesce(sum({rowsum} * cnt * cnt), 0) AS BIGINT)"
        ).alias("rsum2"),
    )
    var_c = (
        (2.0 * (2 * w_sum) + s2) * (n_cells - 1) - 4.0 * w_sum * w_sum
    ) / (2.0 * (n_cells + 1) * w_sum * w_sum)
    c = _geary_out_sql(n_cells, w_sum)
    z = f"(({c} - 1.0E0) / {_pf(math.sqrt(var_c))})"
    return mom.crossJoin(F.broadcast(pair)).selectExpr(
        f"CAST({n_cells} AS BIGINT) AS n_cells",
        f"CAST({w_sum} AS BIGINT) AS w_sum",
        "sx", "rsum2", "psum",
        f"round({c}, 6) AS gearys_c",
        f"round({z}, 6) AS z",
        f"(CASE WHEN {z} <= -1.96E0 THEN 'clustered' "
        f"WHEN {z} >= 1.96E0 THEN 'dispersed' "
        f"ELSE 'random' END) AS pattern",
    )


# ----------------------------------------- join count statistics --

def _joincount_consts(cell_deg: float, lat0: float, lat1: float):
    """(nx, cy0, cy1, n_cells, s0, s1, s2) — the Cliff & Ord weight
    sums for the binary symmetric 3x3-minus-self wrapped lattice:
    S0 = Σ w_ij (ordered) = w_sum, S1 = ½Σ(w_ij+w_ji)² = 2·S0,
    S2 = Σ_i (rowsum_i + colsum_i)² = 4·Σ rowsum_i². All compile-time
    lattice constants."""
    nx, cy0, cy1, n_cells, w_sum = _moran_lattice(cell_deg, lat0, lat1)
    s2 = 4 * nx * (2 * 25 + (cy1 - cy0 - 2) * 64)
    return nx, cy0, cy1, n_cells, w_sum, 2 * w_sum, s2


def _joincount_out_sql(n_cells: int, s0: int, s1: int, s2: int) -> tuple:
    """Shared projection over (n_black, bbord, rsumb): observed joins,
    the free-sampling expectation/variance of BB, and the z label.

    With b_i ∈ {0,1} on the FIXED lattice (empty cells white):
        J_BB = bbord/2            (bbord = Σ_ordered w_ij b_i b_j, even)
        J_BW = rsumb − bbord      (each unordered BW pair appears once
                                   in Σ w_ij b_i (1−b_j))
        J_WW = S0/2 − J_BB − J_BW
    Free sampling with p = nB/n (derived from E[b_i b_j b_k b_l] = p^d,
    d = #distinct indices; the index-overlap census is S1 / S2−2S1 /
    S0²+S1−S2):
        E[BB]   = (S0/2)·p²
        Var[BB] = ¼(S1 p² + (S2−2S1) p³ + (S1−S2) p⁴)
    z = (J_BB − E)/√Var, NULL for an all-black or all-white surface."""
    n = f"{n_cells}.0E0"
    p = f"(CAST(n_black AS DOUBLE) / {n})"
    e_bb = f"({s0}.0E0 / 2.0E0 * {p} * {p})"
    var_bb = (
        f"(({s1}.0E0 * {p} * {p} "
        f"+ ({s2}.0E0 - 2.0E0 * {s1}.0E0) * {p} * {p} * {p} "
        f"+ ({s1}.0E0 - {s2}.0E0) * {p} * {p} * {p} * {p}) / 4.0E0)"
    )
    jbb = "CAST(bbord / 2 AS BIGINT)"
    z = (
        f"((CAST(bbord AS DOUBLE) / 2.0E0 - {e_bb}) "
        f"/ nullif(sqrt({var_bb}), 0.0E0))"
    )
    return (
        f"{jbb} AS j_bb",
        "CAST(rsumb - bbord AS BIGINT) AS j_bw",
        f"CAST({s0} / 2 - bbord / 2 - (rsumb - bbord) AS BIGINT) AS j_ww",
        f"round({e_bb}, 6) AS e_bb",
        f"round({var_bb}, 6) AS var_bb",
        f"round({z}, 6) AS z_bb",
        f"(CASE WHEN {z} >= 1.96E0 THEN 'clustered' "
        f"WHEN {z} <= -1.96E0 THEN 'dispersed' "
        f"ELSE 'random' END) AS pattern",
    )


def join_counts_sql(
    src_sql: str,
    cell_deg: float,
    lat0: float,
    lat1: float,
    hot_threshold: int = 1,
    lon: str = "lon",
    lat: str = "lat",
) -> str:
    """Join count statistics (Moran 1948; the autocorrelation test for
    a BINARY surface — the nominal-data sibling of :func:`morans_i`).
    Cells of the FIXED lattice are black where the event count reaches
    ``hot_threshold`` (empty cells are white), and the black-black /
    black-white / white-white adjacency joins are counted exactly over
    the wrapped binary 3x3-minus-self weights, with the free-sampling
    expectation, variance, and z for BB (the clustering test).

    Output: one row (n_cells, n_black, j_bb, j_bw, j_ww, e_bb, var_bb,
    z_bb, pattern) — the three join counts are exact BIGINTs summing
    to S0/2."""
    if hot_threshold < 1:
        raise ValueError(
            f"hot_threshold must be >= 1, got {hot_threshold}"
        )
    nx, cy0, cy1, n_cells, s0, s1, s2 = _joincount_consts(
        cell_deg, lat0, lat1,
    )
    offs = ", ".join(
        f"({dx}, {dy})"
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)
        if not (dx == 0 and dy == 0)
    )
    counts = _counts_sql(src_sql, cell_deg, cy0, cy1, lon, lat)
    rowsum = (
        f"(CASE WHEN cy = {cy0} OR cy = {cy1 - 1} THEN 5 ELSE 8 END)"
    )
    return (
        f"WITH counts AS ({counts}), "
        f"blk AS (SELECT cx, cy FROM counts "
        f"WHERE cnt >= {int(hot_threshold)}), "
        f"offs(dx, dy) AS (VALUES {offs}), "
        f"scat AS (SELECT ((b.cx + o.dx + {nx}) % {nx}) AS tx, "
        f"(b.cy + o.dy) AS ty FROM blk b CROSS JOIN offs o "
        f"WHERE (b.cy + o.dy) >= {cy0} AND (b.cy + o.dy) < {cy1}), "
        f"pair AS (SELECT CAST(count(*) AS BIGINT) AS bbord "
        f"FROM scat s JOIN blk t ON s.tx = t.cx AND s.ty = t.cy), "
        f"mom AS (SELECT CAST(count(*) AS BIGINT) AS n_black, "
        f"CAST(coalesce(sum({rowsum}), 0) AS BIGINT) AS rsumb "
        f"FROM blk) "
        f"SELECT CAST({n_cells} AS BIGINT) AS n_cells, n_black, "
        + ", ".join(_joincount_out_sql(n_cells, s0, s1, s2))
        + " FROM mom CROSS JOIN pair"
    )


def join_counts(
    df: DataFrame,
    cell_deg: float,
    lat0: float,
    lat1: float,
    hot_threshold: int = 1,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Join count statistics (see :func:`join_counts_sql`). Plan: ONE
    corpus hash-aggregate to the cell table, the bounded 8-offset
    Generate over BLACK cells only, one cell-sized join, 1-row
    broadcast-combined aggregates."""
    if hot_threshold < 1:
        raise ValueError(
            f"hot_threshold must be >= 1, got {hot_threshold}"
        )
    nx, cy0, cy1, n_cells, s0, s1, s2 = _joincount_consts(
        cell_deg, lat0, lat1,
    )
    _, cx, cy = cell_id_sql(cell_deg, lon, lat)
    blk = (
        df.selectExpr(f"{cx} AS cx", f"{cy} AS cy")
        .filter(f"cy >= {cy0} AND cy < {cy1}")
        .groupBy("cx", "cy")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .filter(F.col("cnt") >= int(hot_threshold))
        .select("cx", "cy")
    )
    offs = ", ".join(
        f"struct({dx} AS dx, {dy} AS dy)"
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)
        if not (dx == 0 and dy == 0)
    )
    scat = blk.selectExpr(
        f"explode(array({offs})) AS o", "cx", "cy"
    ).selectExpr(
        f"((cx + o.dx + {nx}) % {nx}) AS tx", "(cy + o.dy) AS ty",
    ).filter(f"ty >= {cy0} AND ty < {cy1}")
    pair = scat.join(
        blk, (scat.tx == blk.cx) & (scat.ty == blk.cy)
    ).agg(F.expr("CAST(count(*) AS BIGINT)").alias("bbord"))
    rowsum = (
        f"(CASE WHEN cy = {cy0} OR cy = {cy1 - 1} THEN 5 ELSE 8 END)"
    )
    mom = blk.agg(
        F.expr("CAST(count(*) AS BIGINT)").alias("n_black"),
        F.expr(
            f"CAST(coalesce(sum({rowsum}), 0) AS BIGINT)"
        ).alias("rsumb"),
    )
    return mom.crossJoin(F.broadcast(pair)).selectExpr(
        f"CAST({n_cells} AS BIGINT) AS n_cells",
        "n_black",
        *_joincount_out_sql(n_cells, s0, s1, s2),
    )


# ------------------------ space-time permutation scan (Kulldorff) --

def _scan_params(
    cell_deg: float, lat0: float, lat1: float,
    t0_us: int, bin_us: int, n_bins: int,
    w_max: int, min_count: int,
) -> tuple:
    """(nx, cy0, cy1) after validating the lattice, the bin clock, the
    cylinder height range, and the count floor."""
    nx, _, _ = _grid_params(cell_deg)
    _check_window_nx(nx, 1)
    cy0, cy1 = _lat_band(cell_deg, lat0, lat1)
    _mk_params(t0_us, bin_us, n_bins)
    if not 1 <= w_max <= n_bins:
        raise ValueError(
            f"w_max must be in [1, n_bins={n_bins}], got {w_max}"
        )
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    return nx, cy0, cy1


def _scan_out_sql(min_count: int, llr_min: float) -> tuple:
    """Shared keep-rule + projection over (obs, s_marg, t_marg, n):
    expected = S·T/N (the space-time permutation expectation,
    conditioning on both marginals), the Poisson generalized LLR

        llr = o·ln(o/e) + (N−o)·ln((N−o)/(N−e))   for o > e
              (second term -> 0 when o = N)

    and the relative risk o/e. Returns (keep_sql, projections)."""
    e = (
        "(CAST(s_marg AS DOUBLE) * CAST(t_marg AS DOUBLE) "
        "/ CAST(n AS DOUBLE))"
    )
    o = "CAST(obs AS DOUBLE)"
    nn = "CAST(n AS DOUBLE)"
    tail = (
        f"(CASE WHEN obs = n THEN 0.0E0 ELSE "
        f"({nn} - {o}) * ln(({nn} - {o}) / ({nn} - {e})) END)"
    )
    llr = f"({o} * ln({o} / {e}) + {tail})"
    keep = (
        f"obs >= {int(min_count)} AND {o} > {e} "
        f"AND round({llr}, 6) >= {_pf(float(llr_min))}"
    )
    return keep, (
        f"round({e}, 6) AS expected",
        f"round({o} / {e}, 6) AS relative_risk",
        f"round({llr}, 6) AS llr",
    )


def spacetime_scan_sql(
    src_sql: str,
    cell_deg: float,
    lat0: float,
    lat1: float,
    t0_us: int,
    bin_us: int,
    n_bins: int,
    w_max: int = 4,
    min_count: int = 3,
    llr_min: float = 0.0,
    ts_us: str = "ts_us",
    lon: str = "lon",
    lat: str = "lat",
    prospective: bool = False,
) -> str:
    """Space-time permutation scan statistic (Kulldorff et al. 2005 —
    the SaTScan prospective outbreak detector; the inferential
    generalization of :func:`emerging_hotspots`): every cylinder
    (3x3-cell base centered on a lattice cell × w consecutive time
    bins, w = 1..w_max, complete windows only) is scored by the Poisson
    generalized likelihood ratio of its observed count against the
    expectation S·T/N that conditions on BOTH marginals — so purely
    spatial hotspots and purely temporal bursts score 0 by
    construction; only space-time INTERACTION scores.

    Cylinders with obs >= min_count, obs > expected, and
    round(llr, 6) >= llr_min are returned (obs = 0 cylinders cannot
    appear: they are built from present (cell, bin) counts; llr_min = 0
    keeps every positive-excess cylinder, ~2+ keeps noteworthy ones). The Monte-Carlo permutation p-value of the
    max-LLR cluster is an upstream concern (SaTScan runs 999
    replications; a deterministic-hash replication harness belongs to
    the caller) — the statistic surface here is the exact LLR ranking.

    Output: (cx, cy, t_start, w_bins, obs, s_marg, t_marg, expected,
    relative_risk, llr); floats round(.,6). Lon wraps; lat clips at the
    band; empty cells need no fill (they only dilute marginals, which
    count events, not cells).
    """
    nx, cy0, cy1 = _scan_params(
        cell_deg, lat0, lat1, t0_us, bin_us, n_bins, w_max, min_count,
    )
    _, cx, cy = cell_id_sql(cell_deg, lon, lat)
    b = _bin_sql(ts_us, t0_us, bin_us)
    offs = ", ".join(
        f"({dx}, {dy})" for dx in (-1, 0, 1) for dy in (-1, 0, 1)
    )
    wdt = ", ".join(
        f"({w}, {dt})" for w in range(1, w_max + 1) for dt in range(w)
    )
    keep, proj = _scan_out_sql(min_count, llr_min)
    # prospective (SaTScan surveillance mode): only cylinders ACTIVE at
    # the latest bin — the window must END exactly at n_bins
    wop = "=" if prospective else "<="
    return (
        f"WITH counts AS (SELECT {cx} AS cx, {cy} AS cy, {b} AS tb, "
        f"CAST(count(*) AS BIGINT) AS cnt FROM ({src_sql}) s "
        f"WHERE {cy} >= {cy0} AND {cy} < {cy1} "
        f"AND {b} >= 0 AND {b} < {n_bins} GROUP BY 1, 2, 3), "
        f"offs(dx, dy) AS (VALUES {offs}), "
        f"wdt(w, dt) AS (VALUES {wdt}), "
        f"cyl AS (SELECT ((c.cx + o.dx + {nx}) % {nx}) AS cx, "
        f"(c.cy + o.dy) AS cy, (c.tb - d.dt) AS ts, d.w, "
        f"CAST(sum(c.cnt) AS BIGINT) AS obs "
        f"FROM counts c CROSS JOIN offs o CROSS JOIN wdt d "
        f"WHERE (c.cy + o.dy) >= {cy0} AND (c.cy + o.dy) < {cy1} "
        f"AND (c.tb - d.dt) >= 0 AND (c.tb - d.dt) + d.w {wop} {n_bins} "
        f"GROUP BY 1, 2, 3, 4), "
        f"cell AS (SELECT cx, cy, CAST(sum(cnt) AS BIGINT) AS cell_tot "
        f"FROM counts GROUP BY 1, 2), "
        f"smarg AS (SELECT ((l.cx + o.dx + {nx}) % {nx}) AS cx, "
        f"(l.cy + o.dy) AS cy, CAST(sum(l.cell_tot) AS BIGINT) AS s_marg "
        f"FROM cell l CROSS JOIN offs o "
        f"WHERE (l.cy + o.dy) >= {cy0} AND (l.cy + o.dy) < {cy1} "
        f"GROUP BY 1, 2), "
        f"bins AS (SELECT tb, CAST(sum(cnt) AS BIGINT) AS bin_tot "
        f"FROM counts GROUP BY 1), "
        f"tmarg AS (SELECT (b.tb - d.dt) AS ts, d.w, "
        f"CAST(sum(b.bin_tot) AS BIGINT) AS t_marg "
        f"FROM bins b CROSS JOIN wdt d "
        f"WHERE (b.tb - d.dt) >= 0 AND (b.tb - d.dt) + d.w {wop} {n_bins} "
        f"GROUP BY 1, 2), "
        f"tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM counts) "
        f"SELECT y.cx, y.cy, y.ts AS t_start, y.w AS w_bins, y.obs, "
        f"m.s_marg, t.t_marg, "
        + ", ".join(proj)
        + f" FROM cyl y JOIN smarg m ON y.cx = m.cx AND y.cy = m.cy "
        f"JOIN tmarg t ON y.ts = t.ts AND y.w = t.w "
        f"CROSS JOIN tot WHERE {keep}"
    )


def spacetime_scan(
    df: DataFrame,
    cell_deg: float,
    lat0: float,
    lat1: float,
    t0_us: int,
    bin_us: int,
    n_bins: int,
    w_max: int = 4,
    min_count: int = 3,
    llr_min: float = 0.0,
    ts_us: str = "ts_us",
    lon: str = "lon",
    lat: str = "lat",
    prospective: bool = False,
) -> DataFrame:
    """Space-time permutation scan (see :func:`spacetime_scan_sql`).
    Plan: ONE corpus hash-aggregate to the (cell, bin) table; the
    cylinder fan-out is a bounded double Generate (9 spatial offsets ×
    w_max(w_max+1)/2 time offsets) over that table; both marginals are
    cell-table-sized re-aggregations that REUSE the counts exchange and
    broadcast into the cylinder join; N broadcasts. The corpus is
    scanned once; nothing downstream exceeds lattice × bins × Σw."""
    nx, cy0, cy1 = _scan_params(
        cell_deg, lat0, lat1, t0_us, bin_us, n_bins, w_max, min_count,
    )
    wop = "=" if prospective else "<="
    _, cx, cy = cell_id_sql(cell_deg, lon, lat)
    b = _bin_sql(ts_us, t0_us, bin_us)
    counts = (
        df.selectExpr(f"{cx} AS cx", f"{cy} AS cy", f"{b} AS tb")
        .filter(
            f"cy >= {cy0} AND cy < {cy1} AND tb >= 0 AND tb < {n_bins}"
        )
        .groupBy("cx", "cy", "tb")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        # r6: pin the corpus aggregate ONCE. counts feeds four subtrees
        # (cyl, smarg, tmarg, tot); without this Spark re-runs the
        # corpus scan + hash-aggregate per reference (the executed plan
        # had 4 InMemoryTableScans of the event cache — the CTE
        # re-inlining defect class from the r5 read-amplification
        # audit). The table is lattice x bins bounded (< 30k rows).
        .localCheckpoint()
    )
    offs = ", ".join(
        f"struct({dx} AS dx, {dy} AS dy)"
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)
    )
    wdt = ", ".join(
        f"struct({w} AS w, {dt} AS dt)"
        for w in range(1, w_max + 1) for dt in range(w)
    )
    cyl = (
        counts.selectExpr(
            f"explode(array({offs})) AS o", "cx", "cy", "tb", "cnt"
        )
        .selectExpr(
            f"((cx + o.dx + {nx}) % {nx}) AS ccx", "(cy + o.dy) AS ccy",
            "tb", "cnt",
        )
        .filter(f"ccy >= {cy0} AND ccy < {cy1}")
        .selectExpr(
            f"explode(array({wdt})) AS d", "ccx", "ccy", "tb", "cnt"
        )
        .selectExpr(
            "ccx", "ccy", "(tb - d.dt) AS ts", "d.w AS w", "cnt"
        )
        .filter(f"ts >= 0 AND ts + w {wop} {n_bins}")
        .groupBy("ccx", "ccy", "ts", "w")
        .agg(F.sum("cnt").cast("bigint").alias("obs"))
    )
    cell = counts.groupBy("cx", "cy").agg(
        F.sum("cnt").cast("bigint").alias("cell_tot")
    )
    smarg = (
        cell.selectExpr(
            f"explode(array({offs})) AS o", "cx", "cy", "cell_tot"
        )
        .selectExpr(
            f"((cx + o.dx + {nx}) % {nx}) AS scx", "(cy + o.dy) AS scy",
            "cell_tot",
        )
        .filter(f"scy >= {cy0} AND scy < {cy1}")
        .groupBy("scx", "scy")
        .agg(F.sum("cell_tot").cast("bigint").alias("s_marg"))
    )
    bins = counts.groupBy("tb").agg(
        F.sum("cnt").cast("bigint").alias("bin_tot")
    )
    tmarg = (
        bins.selectExpr(f"explode(array({wdt})) AS d", "tb", "bin_tot")
        .selectExpr("(tb - d.dt) AS tts", "d.w AS tw", "bin_tot")
        .filter(f"tts >= 0 AND tts + tw {wop} {n_bins}")
        .groupBy("tts", "tw")
        .agg(F.sum("bin_tot").cast("bigint").alias("t_marg"))
    )
    tot = counts.agg(F.sum("cnt").cast("bigint").alias("n"))
    keep, proj = _scan_out_sql(min_count, llr_min)
    return (
        cyl.join(
            F.broadcast(smarg),
            (cyl.ccx == smarg.scx) & (cyl.ccy == smarg.scy),
        )
        .join(
            F.broadcast(tmarg),
            (cyl.ts == tmarg.tts) & (cyl.w == tmarg.tw),
        )
        .crossJoin(F.broadcast(tot))
        .selectExpr(
            "ccx AS cx", "ccy AS cy", "ts AS t_start", "w AS w_bins",
            "obs", "s_marg", "t_marg", "n",
        )
        .filter(keep)
        .selectExpr(
            "cx", "cy", "t_start", "w_bins", "obs", "s_marg", "t_marg",
            *proj,
        )
    )


# ------------------------------------- Getis-Ord General G (global) --

def _general_g_out_sql(n_cells: int, s0: int, s1: int, s2: int) -> tuple:
    """Shared projection over the exact BIGINT moments (m1, m2, m3, m4,
    psum): the global G, its permutation expectation E[G] =
    S0/(n(n−1)), the Getis & Ord (1992) randomization variance

        Var[G] = (B0·m2² + B1·m4 + B2·m1²·m2 + B3·m1·m3 + B4·m1⁴)
                 / ((m1² − m2)² · n(n−1)(n−2)(n−3))  −  E[G]²

    with the B coefficients in the lattice constants S0/S1/S2 (verified
    against EXACT exhaustive permutation enumeration on a 6-cell
    lattice in tests), and the z-score with a two-sided 5% label
    ('high' = high values cluster, G > E)."""
    n = n_cells
    s02 = s0 * s0
    b0 = (n * n - 3 * n + 3) * s1 - n * s2 + 3 * s02
    b1 = -((n * n - n) * s1 - 2 * n * s2 + 6 * s02)
    b2 = -(2 * n * s1 - (n + 3) * s2 + 6 * s02)
    b3 = 4 * (n - 1) * s1 - 2 * (n + 1) * s2 + 8 * s02
    b4 = s1 - s2 + s02
    m1 = "CAST(m1 AS DOUBLE)"
    m2 = "CAST(m2 AS DOUBLE)"
    m3 = "CAST(m3 AS DOUBLE)"
    m4 = "CAST(m4 AS DOUBLE)"
    g = (
        f"(CAST(psum AS DOUBLE) "
        f"/ nullif({m1} * {m1} - {m2}, 0.0E0))"
    )
    e_g = float(s0) / (n * (n - 1))
    num = (
        f"({_pf(float(b0))} * {m2} * {m2} + {_pf(float(b1))} * {m4} "
        f"+ {_pf(float(b2))} * {m1} * {m1} * {m2} "
        f"+ {_pf(float(b3))} * {m1} * {m3} "
        f"+ {_pf(float(b4))} * {m1} * {m1} * {m1} * {m1})"
    )
    den = f"(({m1} * {m1} - {m2}) * ({m1} * {m1} - {m2}))"
    nperm = float(n) * (n - 1) * (n - 2) * (n - 3)
    var = (
        f"({num} / nullif({den} * {_pf(nperm)}, 0.0E0) "
        f"- {_pf(e_g * e_g)})"
    )
    z = f"(({g} - {_pf(e_g)}) / nullif(sqrt({var}), 0.0E0))"
    return (
        f"round({g}, 6) AS general_g",
        f"{_pf(e_g)} AS e_g",
        f"round({var}, 6) AS var_g",
        f"round({z}, 6) AS z",
        f"(CASE WHEN {z} >= 1.96E0 THEN 'high' "
        f"WHEN {z} <= -1.96E0 THEN 'low' "
        f"ELSE 'random' END) AS pattern",
    )


def general_g_sql(
    src_sql: str,
    cell_deg: float,
    lat0: float,
    lat1: float,
    lon: str = "lon",
    lat: str = "lat",
) -> str:
    """Getis-Ord General G (Getis & Ord 1992) of the event-count
    surface — the GLOBAL companion of :func:`getis_ord_gi`: do HIGH
    values cluster (G > E[G]) or LOW values (G < E[G])? Moran's I
    cannot tell these apart; G can (it is a cross-product of raw
    values, not deviations). Same fixed lattice, binary 3x3-minus-self
    wrapped weights, empty cells x = 0.

    Exact BIGINT moments m1..m4 = Σx^k (headroom: Σcnt⁴ < 2^63 caps a
    single cell at ~55k events when ~1e3 cells are busy — shard counts
    upstream past that) + the Moran pair sum. Output: one row (n_cells,
    w_sum, m1, psum, general_g, e_g, var_g, z, pattern)."""
    nx, cy0, cy1, n_cells, w_sum = _moran_lattice(cell_deg, lat0, lat1)
    s2 = 4 * nx * (2 * 25 + (cy1 - cy0 - 2) * 64)
    offs = ", ".join(
        f"({dx}, {dy})"
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)
        if not (dx == 0 and dy == 0)
    )
    counts = _counts_sql(src_sql, cell_deg, cy0, cy1, lon, lat)
    return (
        f"WITH counts AS ({counts}), "
        f"offs(dx, dy) AS (VALUES {offs}), "
        f"scat AS (SELECT ((c.cx + o.dx + {nx}) % {nx}) AS tx, "
        f"(c.cy + o.dy) AS ty, c.cnt "
        f"FROM counts c CROSS JOIN offs o "
        f"WHERE (c.cy + o.dy) >= {cy0} AND (c.cy + o.dy) < {cy1}), "
        f"pair AS (SELECT CAST(coalesce(sum(s.cnt * t.cnt), 0) "
        f"AS BIGINT) AS psum "
        f"FROM scat s JOIN counts t ON s.tx = t.cx AND s.ty = t.cy), "
        f"mom AS (SELECT "
        f"CAST(coalesce(sum(cnt), 0) AS BIGINT) AS m1, "
        f"CAST(coalesce(sum(cnt * cnt), 0) AS BIGINT) AS m2, "
        f"CAST(coalesce(sum(cnt * cnt * cnt), 0) AS BIGINT) AS m3, "
        f"CAST(coalesce(sum(cnt * cnt * cnt * cnt), 0) AS BIGINT) AS m4 "
        f"FROM counts) "
        f"SELECT CAST({n_cells} AS BIGINT) AS n_cells, "
        f"CAST({w_sum} AS BIGINT) AS w_sum, m1, psum, "
        + ", ".join(
            _general_g_out_sql(n_cells, w_sum, 2 * w_sum, s2)
        )
        + " FROM mom CROSS JOIN pair"
    )


def general_g(
    df: DataFrame,
    cell_deg: float,
    lat0: float,
    lat1: float,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Getis-Ord General G (see :func:`general_g_sql`). Plan: the
    Moran/Geary shape — ONE corpus hash-aggregate, bounded 8-offset
    Generate, cell-sized pair join, 1-row broadcast combine."""
    nx, cy0, cy1, n_cells, w_sum = _moran_lattice(cell_deg, lat0, lat1)
    s2 = 4 * nx * (2 * 25 + (cy1 - cy0 - 2) * 64)
    _, cx, cy = cell_id_sql(cell_deg, lon, lat)
    counts = (
        df.selectExpr(f"{cx} AS cx", f"{cy} AS cy")
        .filter(f"cy >= {cy0} AND cy < {cy1}")
        .groupBy("cx", "cy")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    offs = ", ".join(
        f"struct({dx} AS dx, {dy} AS dy)"
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)
        if not (dx == 0 and dy == 0)
    )
    scat = counts.selectExpr(
        f"explode(array({offs})) AS o", "cx", "cy", "cnt"
    ).selectExpr(
        f"((cx + o.dx + {nx}) % {nx}) AS tx", "(cy + o.dy) AS ty",
        "cnt AS scnt",
    ).filter(f"ty >= {cy0} AND ty < {cy1}")
    pair = scat.join(
        counts, (scat.tx == counts.cx) & (scat.ty == counts.cy)
    ).agg(
        F.expr(
            "CAST(coalesce(sum(scnt * cnt), 0) AS BIGINT)"
        ).alias("psum")
    )
    mom = counts.agg(
        F.expr("CAST(coalesce(sum(cnt), 0) AS BIGINT)").alias("m1"),
        F.expr(
            "CAST(coalesce(sum(cnt * cnt), 0) AS BIGINT)"
        ).alias("m2"),
        F.expr(
            "CAST(coalesce(sum(cnt * cnt * cnt), 0) AS BIGINT)"
        ).alias("m3"),
        F.expr(
            "CAST(coalesce(sum(cnt * cnt * cnt * cnt), 0) AS BIGINT)"
        ).alias("m4"),
    )
    return mom.crossJoin(F.broadcast(pair)).selectExpr(
        f"CAST({n_cells} AS BIGINT) AS n_cells",
        f"CAST({w_sum} AS BIGINT) AS w_sum",
        "m1", "psum",
        *_general_g_out_sql(n_cells, w_sum, 2 * w_sum, s2),
    )


# ------------------------------ per-cell temporal autocorrelation --

def _acf_out_sql(T: int, kcol: str = "k") -> str:
    """Shared acf expression over (k, pk, head_k+tail_k as ht, s, sxx):
    with m = S/T over the ZERO-FILLED series,

        C_k = P_k − m·(2S − ht) + (T−k)·m²
        C_0 = sxx − T·m²        acf_k = C_k / C_0

    P_k, S, sxx, ht are exact BIGINTs; only m and the final ratio are
    doubles. NULL for a constant series (C_0 = 0)."""
    m = f"(CAST(s AS DOUBLE) / {T}.0E0)"
    ck = (
        f"(CAST(pk AS DOUBLE) "
        f"- {m} * (2.0E0 * CAST(s AS DOUBLE) - CAST(ht AS DOUBLE)) "
        f"+ (CAST({T} - {kcol} AS DOUBLE)) * {m} * {m})"
    )
    c0 = f"(CAST(sxx AS DOUBLE) - {T}.0E0 * {m} * {m})"
    return f"round({ck} / nullif({c0}, 0.0E0), 6)"


def acf_cells_sql(
    src_sql: str,
    cell_deg: float,
    t0_us: int,
    bin_us: int,
    n_bins: int,
    max_lag: int = 3,
    ts_us: str = "ts_us",
    lon: str = "lon",
    lat: str = "lat",
) -> str:
    """Per-cell temporal autocorrelation function of binned event
    counts (the space-time-cube diagnostic ESRI pairs with the
    Mann-Kendall trend; Box-Jenkins sample ACF with the fixed zero-
    filled clock): for each lattice cell holding at least one in-range
    event and each lag k = 1..max_lag,

        acf_k = Σ_{t=k}^{T−1}(x_t−m)(x_{t−k}−m) / Σ(x_t−m)²

    over the T-bin zero-filled series. Empty bins are NEVER
    materialized: the lag cross-moment P_k only needs present-present
    bin pairs (zeros null the product), and the edge corrections use
    head/tail conditional sums — the Mann-Kendall zero-bin trick
    applied to autocovariance. A Bartlett white-noise band
    ±1.96/√T flags significance.

    Output: (cx, cy, lag, n_events, acf, significant) — acf NULL for a
    constant series."""
    _, cx, cy = cell_id_sql(cell_deg, lon, lat)
    _mk_params(t0_us, bin_us, n_bins)
    if not 1 <= max_lag < n_bins:
        raise ValueError(
            f"max_lag must be in [1, n_bins-1={n_bins - 1}], "
            f"got {max_lag}"
        )
    b = _bin_sql(ts_us, t0_us, bin_us)
    T = n_bins
    ks = ", ".join(f"({k})" for k in range(1, max_lag + 1))
    heads = ", ".join(
        f"CAST(coalesce(sum(CASE WHEN tb < {k} THEN cnt ELSE 0 END), 0) "
        f"AS BIGINT) AS head{k}, "
        f"CAST(coalesce(sum(CASE WHEN tb > {T - 1 - k} THEN cnt "
        f"ELSE 0 END), 0) AS BIGINT) AS tail{k}"
        for k in range(1, max_lag + 1)
    )
    ht_case = " ".join(
        f"WHEN l.k = {k} THEN head{k} + tail{k}"
        for k in range(1, max_lag + 1)
    )
    acf = _acf_out_sql(T)
    band = 1.96 / math.sqrt(T)
    return (
        f"WITH counts AS (SELECT {cx} AS cx, {cy} AS cy, {b} AS tb, "
        f"CAST(count(*) AS BIGINT) AS cnt FROM ({src_sql}) s "
        f"WHERE {b} >= 0 AND {b} < {T} GROUP BY 1, 2, 3), "
        f"ks(k) AS (VALUES {ks}), "
        f"pk AS (SELECT a.cx, a.cy, l.k, "
        f"CAST(coalesce(sum(a.cnt * t.cnt), 0) AS BIGINT) AS pk "
        f"FROM counts a CROSS JOIN ks l "
        f"JOIN counts t ON t.cx = a.cx AND t.cy = a.cy "
        f"AND t.tb = a.tb - l.k "
        f"GROUP BY 1, 2, 3), "
        f"mom AS (SELECT cx, cy, "
        f"CAST(sum(cnt) AS BIGINT) AS s, "
        f"CAST(sum(cnt * cnt) AS BIGINT) AS sxx, {heads} "
        f"FROM counts GROUP BY 1, 2), "
        f"grid AS (SELECT m.cx, m.cy, l.k, m.s, m.sxx, "
        f"(CASE {ht_case} END) AS ht, coalesce(p.pk, 0) AS pk "
        f"FROM mom m CROSS JOIN ks l "
        f"LEFT JOIN pk p ON p.cx = m.cx AND p.cy = m.cy AND p.k = l.k) "
        f"SELECT cx, cy, CAST(k AS INT) AS lag, s AS n_events, "
        f"{acf} AS acf, "
        f"(CASE WHEN abs({acf}) > {_pf(band)} THEN true ELSE false "
        f"END) AS significant "
        f"FROM grid"
    )


def acf_cells(
    df: DataFrame,
    cell_deg: float,
    t0_us: int,
    bin_us: int,
    n_bins: int,
    max_lag: int = 3,
    ts_us: str = "ts_us",
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Per-cell lag ACF (see :func:`acf_cells_sql`). Plan: ONE corpus
    hash-aggregate to the (cell, bin) table; the lag cross-moment is a
    bounded max_lag-offset Generate joined back to present bins
    (cell-bounded); per-cell moments REUSE the counts exchange; the
    final (cell × lag) join is lattice-sized."""
    _, cx, cy = cell_id_sql(cell_deg, lon, lat)
    _mk_params(t0_us, bin_us, n_bins)
    if not 1 <= max_lag < n_bins:
        raise ValueError(
            f"max_lag must be in [1, n_bins-1={n_bins - 1}], "
            f"got {max_lag}"
        )
    b = _bin_sql(ts_us, t0_us, bin_us)
    T = n_bins
    counts = (
        df.selectExpr(f"{cx} AS cx", f"{cy} AS cy", f"{b} AS tb")
        .filter(f"tb >= 0 AND tb < {T}")
        .groupBy("cx", "cy", "tb")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    ks = ", ".join(str(k) for k in range(1, max_lag + 1))
    scat = counts.selectExpr(
        f"explode(array({ks})) AS k", "cx", "cy", "tb", "cnt"
    ).selectExpr("k", "cx", "cy", "(tb - k) AS jb", "cnt AS scnt")
    tgt = counts.selectExpr(
        "cx AS tcx", "cy AS tcy", "tb AS jb", "cnt AS tcnt"
    )
    pk = (
        scat.join(
            tgt,
            (scat.cx == tgt.tcx) & (scat.cy == tgt.tcy)
            & (scat.jb == tgt.jb),
        )
        .groupBy("cx", "cy", "k")
        .agg(
            F.expr(
                "CAST(coalesce(sum(scnt * tcnt), 0) AS BIGINT)"
            ).alias("pk")
        )
    )
    heads = [
        F.expr(
            f"CAST(coalesce(sum(CASE WHEN tb < {k} THEN cnt ELSE 0 "
            f"END), 0) AS BIGINT)"
        ).alias(f"head{k}")
        for k in range(1, max_lag + 1)
    ] + [
        F.expr(
            f"CAST(coalesce(sum(CASE WHEN tb > {T - 1 - k} THEN cnt "
            f"ELSE 0 END), 0) AS BIGINT)"
        ).alias(f"tail{k}")
        for k in range(1, max_lag + 1)
    ]
    mom = counts.groupBy("cx", "cy").agg(
        F.sum("cnt").cast("bigint").alias("s"),
        F.sum(F.col("cnt") * F.col("cnt")).cast("bigint").alias("sxx"),
        *heads,
    )
    ht_case = " ".join(
        f"WHEN k = {k} THEN head{k} + tail{k}"
        for k in range(1, max_lag + 1)
    )
    grid = (
        mom.selectExpr(
            f"explode(array({ks})) AS k",
            "cx", "cy", "s", "sxx",
            *[f"head{k}" for k in range(1, max_lag + 1)],
            *[f"tail{k}" for k in range(1, max_lag + 1)],
        )
        .selectExpr(
            "cx AS mcx", "cy AS mcy", "k AS mk", "s", "sxx",
            f"(CASE {ht_case} END) AS ht",
        )
        .join(
            pk,
            (F.col("mcx") == pk.cx) & (F.col("mcy") == pk.cy)
            & (F.col("mk") == pk.k),
            "left",
        )
        .selectExpr(
            "mcx", "mcy", "mk", "s", "sxx", "ht",
            "coalesce(pk, 0) AS pk",
        )
    )
    acf = _acf_out_sql(T, kcol="mk")
    band = 1.96 / math.sqrt(T)
    return grid.selectExpr(
        "mcx AS cx", "mcy AS cy", "CAST(mk AS INT) AS lag",
        "s AS n_events",
        f"{acf} AS acf",
        f"(CASE WHEN abs({acf}) > {_pf(band)} THEN true ELSE false "
        f"END) AS significant",
    )


# ------------------------------------------------ local Geary c_i --

def _local_geary_exprs(n_cells: int, cy0: int, cy1: int) -> dict:
    """The shared expression pieces over (x = coalesce cnt, nbr_sum,
    nbr_sq, m1..m4): the exact BIGINT c_i and the CONDITIONAL-
    randomization moments (x_i held fixed, the other n−1 lattice
    values permuted — w_i neighbor slots are then a simple random
    sample WITHOUT replacement from the n−1 others):

        c_i   = w_i·x² − 2x·nbr_sum + nbr_sq          (exact BIGINT)
        μ_y   = ((n−1)x² − 2x·m1' + m2')/(n−1),  mk' = mk − x^k
        E[c]  = w_i·μ_y
        E[y²] = ((n−1)x⁴ − 4x³m1' + 6x²m2' − 4x·m3' + m4')/(n−1)
        Var[c]= w_i·(E[y²] − μ_y²)·(n−1−w_i)/(n−2)    (SRSWOR fpc)

    verified against exhaustive (n−1)! permutation enumeration in
    tests. Products run in DOUBLE (shared expression — x⁴·moment terms
    exceed BIGINT long before they exceed double's identical-in-both-
    engines arithmetic)."""
    n = n_cells
    w = (
        f"(CASE WHEN cell_y = {cy0} OR cell_y = {cy1 - 1} "
        f"THEN 5.0E0 ELSE 8.0E0 END)"
    )
    x = "CAST(x AS DOUBLE)"
    c = (
        f"({w} * {x} * {x} - 2.0E0 * {x} * CAST(nbr_sum AS DOUBLE) "
        f"+ CAST(nbr_sq AS DOUBLE))"
    )
    m1p = f"(CAST(m1 AS DOUBLE) - {x})"
    m2p = f"(CAST(m2 AS DOUBLE) - {x} * {x})"
    m3p = f"(CAST(m3 AS DOUBLE) - {x} * {x} * {x})"
    m4p = f"(CAST(m4 AS DOUBLE) - {x} * {x} * {x} * {x})"
    nm1 = f"{n - 1}.0E0"
    mu = (
        f"(({nm1} * {x} * {x} - 2.0E0 * {x} * {m1p} + {m2p}) / {nm1})"
    )
    ey2 = (
        f"(({nm1} * {x} * {x} * {x} * {x} "
        f"- 4.0E0 * {x} * {x} * {x} * {m1p} "
        f"+ 6.0E0 * {x} * {x} * {m2p} "
        f"- 4.0E0 * {x} * {m3p} + {m4p}) / {nm1})"
    )
    e_c = f"({w} * {mu})"
    var_c = (
        f"({w} * ({ey2} - {mu} * {mu}) "
        f"* ({nm1} - {w}) / {n - 2}.0E0)"
    )
    z = f"(({c} - {e_c}) / nullif(sqrt({var_c}), 0.0E0))"
    m = f"(CAST(m1 AS DOUBLE) / {n}.0E0)"
    label = (
        f"(CASE WHEN {z} <= -1.96E0 AND {x} > {m} THEN 'high-high' "
        f"WHEN {z} <= -1.96E0 AND {x} < {m} THEN 'low-low' "
        f"WHEN {z} <= -1.96E0 THEN 'other-similar' "
        f"WHEN {z} >= 1.96E0 THEN 'dissimilar' "
        f"ELSE 'none' END)"
    )
    return {"c": c, "e_c": e_c, "var_c": var_c, "z": z, "label": label}


def local_gearys_c_sql(
    src_sql: str,
    cell_deg: float,
    lat0: float,
    lat1: float,
    lon: str = "lon",
    lat: str = "lat",
) -> str:
    """Anselin's local Geary c_i (1995; the LISA decomposition of
    :func:`gearys_c`): c_i = Σ_j w_ij (x_i − x_j)² per lattice cell,
    with ANALYTIC conditional-randomization inference — the exact
    E[c_i] and Var[c_i] under permutation of the other n−1 cells
    (:func:`_local_geary_exprs`; no Monte-Carlo), so z and the cluster
    label are deterministic and dialect-shared. z << 0 means the cell's
    neighborhood is more SIMILAR than chance (positive local
    autocorrelation, split high-high / low-low by the cell value
    against the global mean); z >> 0 a local discontinuity
    ('dissimilar').

    Output: cells with >= 1 event in the 3x3 window (the LISA output
    contract) — (cell_x, cell_y, cnt, c_i, e_ci, z, label)."""
    nx, cy0, cy1, n_cells, _ = _moran_lattice(cell_deg, lat0, lat1)
    counts = _counts_sql(src_sql, cell_deg, cy0, cy1, lon, lat)
    offs = ", ".join(
        f"({dx}, {dy})"
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)
        if not (dx == 0 and dy == 0)
    )
    ex = _local_geary_exprs(n_cells, cy0, cy1)
    return (
        f"WITH counts AS ({counts}), "
        f"offs(dx, dy) AS (VALUES {offs}), "
        f"scat AS (SELECT ((cc.cx + o.dx + {nx}) % {nx}) AS tx, "
        f"(cc.cy + o.dy) AS ty, cc.cnt "
        f"FROM counts cc CROSS JOIN offs o "
        f"WHERE (cc.cy + o.dy) >= {cy0} AND (cc.cy + o.dy) < {cy1}), "
        f"win AS (SELECT tx, ty, CAST(sum(cnt) AS BIGINT) AS nbr_sum, "
        f"CAST(sum(cnt * cnt) AS BIGINT) AS nbr_sq "
        f"FROM scat GROUP BY tx, ty), "
        f"mom AS (SELECT CAST(coalesce(sum(cnt), 0) AS BIGINT) AS m1, "
        f"CAST(coalesce(sum(cnt * cnt), 0) AS BIGINT) AS m2, "
        f"CAST(coalesce(sum(cnt * cnt * cnt), 0) AS BIGINT) AS m3, "
        f"CAST(coalesce(sum(cnt * cnt * cnt * cnt), 0) AS BIGINT) "
        f"AS m4 FROM counts), "
        f"cells AS (SELECT coalesce(w.tx, c.cx) AS cell_x, "
        f"coalesce(w.ty, c.cy) AS cell_y, "
        f"CAST(coalesce(c.cnt, 0) AS BIGINT) AS x, "
        f"CAST(coalesce(w.nbr_sum, 0) AS BIGINT) AS nbr_sum, "
        f"CAST(coalesce(w.nbr_sq, 0) AS BIGINT) AS nbr_sq "
        f"FROM win w FULL OUTER JOIN counts c "
        f"ON c.cx = w.tx AND c.cy = w.ty) "
        f"SELECT cell_x, cell_y, x AS cnt, "
        f"round({ex['c']}, 6) AS c_i, "
        f"round({ex['e_c']}, 6) AS e_ci, "
        f"round({ex['z']}, 6) AS z, "
        f"{ex['label']} AS label "
        f"FROM cells CROSS JOIN mom"
    )


def local_gearys_c(
    df: DataFrame,
    cell_deg: float,
    lat0: float,
    lat1: float,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Local Geary (see :func:`local_gearys_c_sql`). Plan: ONE corpus
    hash-aggregate, the bounded 8-offset Generate (carrying cnt and
    cnt²), a cell-sized FULL OUTER join, and the 1-row global-moment
    broadcast."""
    nx, cy0, cy1, n_cells, _ = _moran_lattice(cell_deg, lat0, lat1)
    _, cx, cy = cell_id_sql(cell_deg, lon, lat)
    counts = (
        df.selectExpr(f"{cx} AS cx", f"{cy} AS cy")
        .filter(f"cy >= {cy0} AND cy < {cy1}")
        .groupBy("cx", "cy")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    offs = ", ".join(
        f"struct({dx} AS dx, {dy} AS dy)"
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)
        if not (dx == 0 and dy == 0)
    )
    win = (
        counts.selectExpr(
            f"explode(array({offs})) AS o", "cx", "cy", "cnt"
        )
        .selectExpr(
            f"((cx + o.dx + {nx}) % {nx}) AS tx", "(cy + o.dy) AS ty",
            "cnt",
        )
        .filter(f"ty >= {cy0} AND ty < {cy1}")
        .groupBy("tx", "ty")
        .agg(
            F.sum("cnt").cast("bigint").alias("nbr_sum"),
            F.sum(F.col("cnt") * F.col("cnt")).cast("bigint").alias(
                "nbr_sq"
            ),
        )
    )
    mom = counts.agg(
        F.expr("CAST(coalesce(sum(cnt), 0) AS BIGINT)").alias("m1"),
        F.expr(
            "CAST(coalesce(sum(cnt * cnt), 0) AS BIGINT)"
        ).alias("m2"),
        F.expr(
            "CAST(coalesce(sum(cnt * cnt * cnt), 0) AS BIGINT)"
        ).alias("m3"),
        F.expr(
            "CAST(coalesce(sum(cnt * cnt * cnt * cnt), 0) AS BIGINT)"
        ).alias("m4"),
    )
    cells = (
        win.join(
            counts,
            (win.tx == counts.cx) & (win.ty == counts.cy),
            "full_outer",
        )
        .selectExpr(
            "coalesce(tx, cx) AS cell_x",
            "coalesce(ty, cy) AS cell_y",
            "CAST(coalesce(cnt, 0) AS BIGINT) AS x",
            "CAST(coalesce(nbr_sum, 0) AS BIGINT) AS nbr_sum",
            "CAST(coalesce(nbr_sq, 0) AS BIGINT) AS nbr_sq",
        )
    )
    ex = _local_geary_exprs(n_cells, cy0, cy1)
    return cells.crossJoin(F.broadcast(mom)).selectExpr(
        "cell_x", "cell_y", "x AS cnt",
        f"round({ex['c']}, 6) AS c_i",
        f"round({ex['e_c']}, 6) AS e_ci",
        f"round({ex['z']}, 6) AS z",
        f"{ex['label']} AS label",
    )


# ------------------------------------ Theil-Sen slope per cell --


def _sen_positions(T: int) -> tuple:
    """Median rank positions over the FIXED pair count T(T-1)/2 — a
    compile-time constant (every cell's zero-filled series has exactly
    T bins, so every cell has the same pair count)."""
    n = T * (T - 1) // 2
    return (n + 1) // 2, (n + 2) // 2, n


def sen_slope_cells_sql(
    src_sql: str,
    cell_deg: float,
    t0_us: int,
    bin_us: int,
    n_bins: int,
    ts_us: str = "ts_us",
    lon: str = "lon",
    lat: str = "lat",
) -> str:
    """Per-cell Theil-Sen (Sen 1968) slope of binned event counts — the
    robust trend MAGNITUDE beside mann_kendall_cells' significance (the
    pairing ArcGIS emerging-hotspot reports): over the zero-filled
    T-bin series, sen = median over all i<j of (x_j − x_i)/(j − i),
    in events per bin.

    Unlike MK's S (closed-form over present bins), the slope median
    needs the actual pair multiset — but it stays BOUNDED: the
    active-cells × T cube (the emerging-hotspots cube) self-joins to
    exactly T(T−1)/2 pairs per cell, and the median rank positions are
    compile-time constants (:func:`_sen_positions`). Each slope is ONE
    double division of exact integers (correctly rounded, identical
    across engines); the even-count median averages the two middle
    values (one add + one divide, deterministic). Equal slopes make
    the row_number tie-break ambiguous but the median depends only on
    the VALUE multiset — position ties carry equal values.

    Also emits mk_s = Σ sign(x_j − x_i) from the same pair set — a
    BIGINT that must equal mann_kendall_cells' closed-form S
    (pytest-asserted), proving cube and closed form agree.

    Output: one row per cell with >= 1 event in [t0, t0 + T·bin):
    (cell_x, cell_y, n_events, mk_s, sen_slope); slope round(.,6).
    """
    _grid_params(cell_deg)
    _mk_params(t0_us, bin_us, n_bins)
    T = int(n_bins)
    m1, m2, npairs = _sen_positions(T)
    _, cx, cy = cell_id_sql(cell_deg, lon, lat)
    binx = _bin_sql(ts_us, t0_us, bin_us)
    bvals = ", ".join(f"({b})" for b in range(T))
    return (
        f"WITH ev AS (SELECT {cx} AS cx, {cy} AS cy, {binx} AS b "
        f"FROM ({src_sql}) s), "
        f"c AS (SELECT cx, cy, b, CAST(count(*) AS BIGINT) AS x "
        f"FROM ev WHERE b >= 0 AND b < {T} GROUP BY 1, 2, 3), "
        f"act AS (SELECT cx, cy, CAST(sum(x) AS BIGINT) AS n_events "
        f"FROM c GROUP BY 1, 2), "
        f"bins(b) AS (VALUES {bvals}), "
        f"cube0 AS (SELECT act.cx, act.cy, "
        f"CAST(bins.b AS BIGINT) AS b, "
        f"CAST(coalesce(c.x, 0) AS BIGINT) AS x "
        f"FROM act CROSS JOIN bins "
        f"LEFT JOIN c ON c.cx = act.cx AND c.cy = act.cy "
        f"AND c.b = CAST(bins.b AS BIGINT)), "
        f"pr AS (SELECT a.cx, a.cy, "
        f"(CAST(b2.x - a.x AS DOUBLE) / CAST(b2.b - a.b AS DOUBLE)) "
        f"AS slope, "
        f"(CASE WHEN b2.x > a.x THEN 1 WHEN b2.x < a.x THEN -1 "
        f"ELSE 0 END) AS sg "
        f"FROM cube0 a JOIN cube0 b2 ON a.cx = b2.cx AND a.cy = b2.cy "
        f"AND b2.b > a.b), "
        f"rk AS (SELECT cx, cy, slope, sg, "
        f"CAST(row_number() OVER (PARTITION BY cx, cy ORDER BY slope) "
        f"AS BIGINT) AS rn FROM pr), "
        f"med AS (SELECT cx, cy, "
        f"CAST(sum(sg) AS BIGINT) AS mk_s, "
        f"avg(CASE WHEN rn = {m1} OR rn = {m2} THEN slope END) "
        f"AS sen FROM rk GROUP BY 1, 2) "
        f"SELECT act.cx AS cell_x, act.cy AS cell_y, act.n_events, "
        f"med.mk_s, round(med.sen, 6) AS sen_slope "
        f"FROM act JOIN med ON act.cx = med.cx AND act.cy = med.cy"
    )


def sen_slope_cells(
    df: DataFrame,
    cell_deg: float,
    t0_us: int,
    bin_us: int,
    n_bins: int,
    ts_us: str = "ts_us",
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Theil-Sen slope per cell (see :func:`sen_slope_cells_sql`). One
    corpus hash aggregation to (cell, bin) counts; the cube fan-out is
    a bounded T-literal explode, the pair join and the rank window are
    cell-keyed (the counts exchange is reused across the active/cube
    branches), and every pair stage is bounded by T(T−1)/2 rows/cell."""
    _grid_params(cell_deg)
    _mk_params(t0_us, bin_us, n_bins)
    T = int(n_bins)
    m1, m2, _ = _sen_positions(T)
    _, cx, cy = cell_id_sql(cell_deg, lon, lat)
    binx = _bin_sql(ts_us, t0_us, bin_us)
    c = (
        df.selectExpr(f"{cx} AS cx", f"{cy} AS cy", f"{binx} AS b")
        .filter(f"b >= 0 AND b < {T}")
        .groupBy("cx", "cy", "b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    )
    act = c.groupBy("cx", "cy").agg(
        F.sum("x").cast("bigint").alias("n_events")
    )
    bins = ", ".join(str(b) for b in range(T))
    cube = (
        act.selectExpr(
            "cx", "cy",
            f"explode(array({bins})) AS b",
        )
        .selectExpr("cx", "cy", "CAST(b AS BIGINT) AS b")
        .join(c, ["cx", "cy", "b"], "left")
        .selectExpr("cx", "cy", "b", "CAST(coalesce(x, 0) AS BIGINT) AS x")
    )
    a = cube.selectExpr("cx", "cy", "b AS b1", "x AS x1")
    b2 = cube.selectExpr("cx", "cy", "b AS b2", "x AS x2")
    pr = (
        a.join(b2, ["cx", "cy"])
        .filter("b2 > b1")
        .selectExpr(
            "cx", "cy",
            "(CAST(x2 - x1 AS DOUBLE) / CAST(b2 - b1 AS DOUBLE)) "
            "AS slope",
            "(CASE WHEN x2 > x1 THEN 1 WHEN x2 < x1 THEN -1 ELSE 0 END)"
            " AS sg",
        )
    )
    w = Window.partitionBy("cx", "cy").orderBy("slope")
    med = (
        pr.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .groupBy("cx", "cy")
        .agg(
            F.sum("sg").cast("bigint").alias("mk_s"),
            F.avg(F.expr(
                f"CASE WHEN rn = {m1} OR rn = {m2} THEN slope END"
            )).alias("sen"),
        )
    )
    return act.join(med, ["cx", "cy"]).selectExpr(
        "cx AS cell_x", "cy AS cell_y", "n_events", "mk_s",
        "round(sen, 6) AS sen_slope",
    )


# ------------------------------- seasonal Mann-Kendall per cell --


def _smk_params(n_bins: int, n_seasons: int) -> int:
    """Validate the seasonal split and return the per-season series
    length Ts = T / P (each season's subseries must be a full,
    equal-length zero-filled series for the closed form to hold)."""
    P = int(n_seasons)
    T = int(n_bins)
    if P < 2:
        raise ValueError(f"n_seasons must be >= 2, got {n_seasons}")
    if T % P != 0:
        raise ValueError(
            f"n_seasons={P} must divide n_bins={T} (equal-length "
            f"seasonal subseries)"
        )
    Ts = T // P
    if Ts < 2:
        raise ValueError(
            f"n_bins/n_seasons = {Ts} leaves no within-season pairs"
        )
    return Ts


def _smk_z_sql(P: int, Ts: int) -> tuple:
    """Shared projection (mk_z, trend) over (mk_s, ttv): the seasonal
    Kendall variance Var = (P·Ts(Ts−1)(2Ts+5) − ttv)/18 where ttv
    already sums each season's present-tie AND zero-group terms —
    every input BIGINT, the variance one double expression."""
    var = (
        f"((CAST({P * Ts * (Ts - 1) * (2 * Ts + 5)} AS DOUBLE) "
        f"- CAST(ttv AS DOUBLE)) / 18.0E0)"
    )
    z = (
        f"(CASE WHEN mk_s > 0 THEN (CAST(mk_s AS DOUBLE) - 1.0E0) "
        f"/ sqrt({var}) "
        f"WHEN mk_s < 0 THEN (CAST(mk_s AS DOUBLE) + 1.0E0) "
        f"/ sqrt({var}) "
        f"ELSE 0.0E0 END)"
    )
    return (
        f"round(CASE WHEN {var} > 0.0E0 THEN {z} END, 6) AS mk_z",
        f"(CASE WHEN {var} > 0.0E0 AND {z} >= 1.96E0 THEN 'increasing' "
        f"WHEN {var} > 0.0E0 AND {z} <= -1.96E0 THEN 'decreasing' "
        f"ELSE 'none' END) AS trend",
    )


def seasonal_mk_cells_sql(
    src_sql: str,
    cell_deg: float,
    t0_us: int,
    bin_us: int,
    n_bins: int,
    n_seasons: int,
    ts_us: str = "ts_us",
    lon: str = "lon",
    lat: str = "lat",
) -> str:
    """Per-cell SEASONAL Mann-Kendall trend (Hirsch, Slack & Smith
    1982 — the standard hydrology/climate trend test when the series
    has a seasonal cycle, which would otherwise masquerade as trend or
    drown it): bins split into P seasons by bin % P; the MK statistic
    runs WITHIN each season's zero-filled subseries (comparing
    January-to-January, never January-to-July) and sums across
    seasons: S = Σ_s S_s, Var = Σ_s Var_s (independent-seasons form;
    the Hirsch-Slack 1984 serial-covariance correction is out of
    scope, documented).

    Exactness mirrors :func:`mann_kendall_cells_sql`: per (cell,
    season), zero bins never materialize — the present-present pair
    sum is a season-bounded ordered self-join and the present-absent
    term is closed-form from within-season index and rank; each
    season's tie-corrected variance decomposes into BIGINT moments
    whose CELL ROLLUP stays BIGINT (ttv sums present-tie and
    zero-group terms; the compile-time total P·Ts(Ts−1)(2Ts+5) joins
    only in the final double expression).

    Output grain of mann_kendall_cells: (cell_x, cell_y, n_events,
    k_bins, mk_s, mk_z, trend); k_bins counts present (season, idx)
    slots; mk_z NULL when every season is fully tied.
    """
    _grid_params(cell_deg)
    _mk_params(t0_us, bin_us, n_bins)
    Ts = _smk_params(n_bins, n_seasons)
    P = int(n_seasons)
    T = int(n_bins)
    _, cx, cy = cell_id_sql(cell_deg, lon, lat)
    binx = _bin_sql(ts_us, t0_us, bin_us)
    zg = f"(({Ts}) - k)"
    return (
        f"WITH ev AS (SELECT {cx} AS cx, {cy} AS cy, {binx} AS b "
        f"FROM ({src_sql}) s), "
        f"c AS (SELECT cx, cy, (b % {P}) AS sn, "
        f"CAST((b - (b % {P})) / {P} AS BIGINT) AS i, "
        f"CAST(count(*) AS BIGINT) AS x "
        f"FROM ev WHERE b >= 0 AND b < {T} GROUP BY 1, 2, 3, 4), "
        f"pp AS (SELECT a.cx, a.cy, a.sn, "
        f"CAST(sum(CASE WHEN b2.x > a.x THEN 1 "
        f"WHEN b2.x < a.x THEN -1 ELSE 0 END) AS BIGINT) AS s_pp "
        f"FROM c a JOIN c b2 ON a.cx = b2.cx AND a.cy = b2.cy "
        f"AND a.sn = b2.sn AND b2.i > a.i GROUP BY 1, 2, 3), "
        f"r AS (SELECT cx, cy, sn, i, x, "
        f"CAST(row_number() OVER (PARTITION BY cx, cy, sn "
        f"ORDER BY i) AS BIGINT) AS rn, "
        f"CAST(count(*) OVER (PARTITION BY cx, cy, sn) AS BIGINT) AS k "
        f"FROM c), "
        f"pa AS (SELECT cx, cy, sn, CAST(max(k) AS BIGINT) AS k, "
        f"CAST(sum(x) AS BIGINT) AS n_events, "
        f"CAST(sum((i - (rn - 1)) - (({Ts - 1}) - i - (k - rn))) "
        f"AS BIGINT) AS s_pa FROM r GROUP BY 1, 2, 3), "
        f"ties AS (SELECT cx, cy, sn, "
        f"CAST(sum(g * (g - 1) * (2 * g + 5)) AS BIGINT) AS ttp "
        f"FROM (SELECT cx, cy, sn, x, CAST(count(*) AS BIGINT) AS g "
        f"FROM c GROUP BY 1, 2, 3, 4) gg GROUP BY 1, 2, 3), "
        f"per AS (SELECT pa.cx, pa.cy, pa.sn, pa.n_events, pa.k, "
        f"CAST(coalesce(pp.s_pp, 0) + pa.s_pa AS BIGINT) AS s_s, "
        f"CAST(ties.ttp + {zg} * ({zg} - 1) * (2 * {zg} + 5) "
        f"AS BIGINT) AS tt_s FROM pa "
        f"LEFT JOIN pp ON pa.cx = pp.cx AND pa.cy = pp.cy "
        f"AND pa.sn = pp.sn "
        f"JOIN ties ON pa.cx = ties.cx AND pa.cy = ties.cy "
        f"AND pa.sn = ties.sn), "
        f"m AS (SELECT cx, cy, CAST(sum(n_events) AS BIGINT) "
        f"AS n_events, CAST(sum(k) AS BIGINT) AS k_bins, "
        f"CAST(sum(s_s) AS BIGINT) AS mk_s, "
        # absent seasons contribute a FULL zero group Ts(Ts-1)(2Ts+5):
        # add it for each of the P - count(sn) seasons with no events
        f"CAST(sum(tt_s) + ({P} - count(*)) "
        f"* {Ts * (Ts - 1) * (2 * Ts + 5)} AS BIGINT) AS ttv "
        f"FROM per GROUP BY 1, 2) "
        f"SELECT cx AS cell_x, cy AS cell_y, n_events, k_bins, mk_s, "
        + ", ".join(_smk_z_sql(P, Ts))
        + " FROM m"
    )


def seasonal_mk_cells(
    df: DataFrame,
    cell_deg: float,
    t0_us: int,
    bin_us: int,
    n_bins: int,
    n_seasons: int,
    ts_us: str = "ts_us",
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Seasonal Mann-Kendall per cell (see
    :func:`seasonal_mk_cells_sql`). Same plan family as
    mann_kendall_cells with the season in every key: ONE corpus
    hash-aggregate, a (cell, season)-bounded ordered self-join, two
    windows and the final cell rollup — all reusing the counts
    exchange; per-cell work O(P·Ts²)."""
    _grid_params(cell_deg)
    _mk_params(t0_us, bin_us, n_bins)
    Ts = _smk_params(n_bins, n_seasons)
    P = int(n_seasons)
    T = int(n_bins)
    _, cx, cy = cell_id_sql(cell_deg, lon, lat)
    binx = _bin_sql(ts_us, t0_us, bin_us)
    c = (
        df.selectExpr(f"{cx} AS cx", f"{cy} AS cy", f"{binx} AS b")
        .filter(f"b >= 0 AND b < {T}")
        .selectExpr(
            "cx", "cy", f"(b % {P}) AS sn",
            f"CAST((b - (b % {P})) / {P} AS BIGINT) AS i",
        )
        .groupBy("cx", "cy", "sn", "i")
        .agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    )
    a = c.selectExpr("cx", "cy", "sn", "i AS i1", "x AS x1")
    b2 = c.selectExpr(
        "cx AS cx2", "cy AS cy2", "sn AS sn2", "i AS i2", "x AS x2"
    )
    pp = (
        a.join(
            b2,
            (a.cx == b2.cx2) & (a.cy == b2.cy2)
            & (a.sn == b2.sn2) & (b2.i2 > a.i1),
        )
        .groupBy("cx", "cy", "sn")
        .agg(
            F.expr(
                "CAST(sum(CASE WHEN x2 > x1 THEN 1 "
                "WHEN x2 < x1 THEN -1 ELSE 0 END) AS BIGINT)"
            ).alias("s_pp")
        )
    )
    r = c.selectExpr(
        "cx", "cy", "sn", "i", "x",
        "CAST(row_number() OVER (PARTITION BY cx, cy, sn ORDER BY i) "
        "AS BIGINT) AS rn",
        "CAST(count(*) OVER (PARTITION BY cx, cy, sn) AS BIGINT) AS k",
    )
    pa = r.groupBy("cx", "cy", "sn").agg(
        F.expr("CAST(max(k) AS BIGINT)").alias("k"),
        F.expr("CAST(sum(x) AS BIGINT)").alias("n_events"),
        F.expr(
            f"CAST(sum((i - (rn - 1)) - (({Ts - 1}) - i - (k - rn))) "
            f"AS BIGINT)"
        ).alias("s_pa"),
    )
    ties = (
        c.groupBy("cx", "cy", "sn", "x")
        .agg(F.count(F.lit(1)).cast("bigint").alias("g"))
        .groupBy("cx", "cy", "sn")
        .agg(
            F.expr(
                "CAST(sum(g * (g - 1) * (2 * g + 5)) AS BIGINT)"
            ).alias("ttp")
        )
    )
    zg = f"(({Ts}) - k)"
    per = (
        pa.join(pp, ["cx", "cy", "sn"], "left")
        .join(ties, ["cx", "cy", "sn"])
        .selectExpr(
            "cx", "cy", "sn", "n_events", "k",
            "CAST(coalesce(s_pp, 0) + s_pa AS BIGINT) AS s_s",
            f"CAST(ttp + {zg} * ({zg} - 1) * (2 * {zg} + 5) "
            f"AS BIGINT) AS tt_s",
        )
    )
    m = per.groupBy("cx", "cy").agg(
        F.expr("CAST(sum(n_events) AS BIGINT)").alias("n_events"),
        F.expr("CAST(sum(k) AS BIGINT)").alias("k_bins"),
        F.expr("CAST(sum(s_s) AS BIGINT)").alias("mk_s"),
        F.expr(
            f"CAST(sum(tt_s) + ({P} - count(*)) "
            f"* {Ts * (Ts - 1) * (2 * Ts + 5)} AS BIGINT)"
        ).alias("ttv"),
    )
    return m.selectExpr(
        "cx AS cell_x", "cy AS cell_y", "n_events", "k_bins", "mk_s",
        *_smk_z_sql(P, Ts),
    )


# ------------------------------------ Pettitt change-point per cell --


def _pettitt_consts(n_bins: int, alpha: float) -> tuple:
    """Compile-time pieces of the Pettitt significance machinery: the
    p-value denominator D = T³ + T² and the DOUBLE threshold on
    6·K² for p ≤ alpha — both Python-computed, so NEITHER engine
    evaluates a transcendental inside the decision path (the exact
    BIGINT 6·K² compares against one shared literal)."""
    T = int(n_bins)
    if T < 4:
        raise ValueError(
            f"n_bins must be >= 4 for a meaningful change point, "
            f"got {n_bins}"
        )
    if not 0.0 < alpha < 1.0:
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
    D = T ** 3 + T ** 2
    # p <= alpha  <=>  2 exp(-6K^2/D) <= alpha  <=>  6K^2 >= D ln(2/a)
    return D, D * math.log(2.0 / alpha)


def _pettitt_out_sql(T: int, D: int, thresh: float) -> tuple:
    """Shared projection (p_value, shift) over (k_stat, u_cp). The
    approximate two-sided p = min(1, 2·exp(−6K²/D)) rounds to 6 both
    sides (exp is libm — the spacetime_scan ln precedent; half-ulp
    round boundary theoretical-but-accepted). Shift direction: U(t)
    sums sgn(early − late), so U > 0 at the change point means the
    level DECREASED."""
    k2 = "CAST(k_stat * k_stat AS DOUBLE)"
    sig = f"(CAST(6 * k_stat * k_stat AS DOUBLE) >= {_pf(thresh)})"
    return (
        f"round(least(1.0E0, 2.0E0 * exp(-6.0E0 * {k2} "
        f"/ {_pf(float(D))})), 6) AS p_value",
        f"(CASE WHEN {sig} AND u_cp > 0 THEN 'decreasing' "
        f"WHEN {sig} AND u_cp < 0 THEN 'increasing' "
        f"ELSE 'none' END) AS shift",
    )


def pettitt_cells_sql(
    src_sql: str,
    cell_deg: float,
    t0_us: int,
    bin_us: int,
    n_bins: int,
    alpha: float = 0.05,
    ts_us: str = "ts_us",
    lon: str = "lon",
    lat: str = "lat",
) -> str:
    """Per-cell Pettitt (1979) change-point test of binned event counts
    — the rank-based companion to mann_kendall_cells for ABRUPT shifts
    (MK assumes a monotone trend; a step change is Pettitt's null
    target, and it is the standard homogeneity test in the same
    hydrology toolbox as MK/Sen).

    Over the zero-filled T-bin series, U(t) = Σ_{i≤t} Σ_{j>t}
    sgn(x_i − x_j) for each split t = 0..T−2; K = max|U(t)|, the
    change point is the earliest argmax, and p ≈ 2·exp(−6K²/(T³+T²)).
    Everything up to the p-value is EXACT BIGINT: the per-bin
    cross-sign sum V(b) = Σ_j sgn(x_b − x_j) comes from the bounded
    cube self-join, U is its prefix sum (Pettitt's own recurrence
    U(t) = U(t−1) + V(t), provable by telescoping), and the argmax
    tie-break is the total-order min_by key (−|U|)·T + b — max |U|,
    then earliest bin — identical in both engines. The significance
    decision compares BIGINT 6K² against ONE Python-computed literal
    (:func:`_pettitt_consts`), so no transcendental decides.

    Output: one row per cell with ≥ 1 event in [t0, t0 + T·bin):
    (cell_x, cell_y, n_events, k_stat, cp_bin, u_cp, p_value, shift);
    cp_bin is the last bin of the pre-change segment; shift is
    'increasing' / 'decreasing' / 'none' at level alpha.
    """
    _grid_params(cell_deg)
    _mk_params(t0_us, bin_us, n_bins)
    T = int(n_bins)
    D, thresh = _pettitt_consts(T, alpha)
    _, cx, cy = cell_id_sql(cell_deg, lon, lat)
    binx = _bin_sql(ts_us, t0_us, bin_us)
    bvals = ", ".join(f"({b})" for b in range(T))
    key = f"(-abs(u)) * {T} + b"
    return (
        f"WITH ev AS (SELECT {cx} AS cx, {cy} AS cy, {binx} AS b "
        f"FROM ({src_sql}) s), "
        f"c AS (SELECT cx, cy, b, CAST(count(*) AS BIGINT) AS x "
        f"FROM ev WHERE b >= 0 AND b < {T} GROUP BY 1, 2, 3), "
        f"act AS (SELECT cx, cy, CAST(sum(x) AS BIGINT) AS n_events "
        f"FROM c GROUP BY 1, 2), "
        f"bins(b) AS (VALUES {bvals}), "
        f"cube0 AS (SELECT act.cx, act.cy, "
        f"CAST(bins.b AS BIGINT) AS b, "
        f"CAST(coalesce(c.x, 0) AS BIGINT) AS x "
        f"FROM act CROSS JOIN bins "
        f"LEFT JOIN c ON c.cx = act.cx AND c.cy = act.cy "
        f"AND c.b = CAST(bins.b AS BIGINT)), "
        f"v AS (SELECT a.cx, a.cy, a.b, "
        f"CAST(sum(CASE WHEN a.x > b2.x THEN 1 "
        f"WHEN a.x < b2.x THEN -1 ELSE 0 END) AS BIGINT) AS v "
        f"FROM cube0 a JOIN cube0 b2 ON a.cx = b2.cx AND a.cy = b2.cy "
        f"GROUP BY 1, 2, 3), "
        f"u AS (SELECT cx, cy, b, "
        f"CAST(sum(v) OVER (PARTITION BY cx, cy ORDER BY b "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
        f"AS BIGINT) AS u FROM v), "
        f"agg AS (SELECT cx, cy, "
        f"CAST(max(abs(u)) AS BIGINT) AS k_stat, "
        f"CAST(min_by(b, {key}) AS BIGINT) AS cp_bin, "
        f"CAST(min_by(u, {key}) AS BIGINT) AS u_cp "
        f"FROM u WHERE b <= {T - 2} GROUP BY 1, 2) "
        f"SELECT act.cx AS cell_x, act.cy AS cell_y, act.n_events, "
        f"agg.k_stat, agg.cp_bin, agg.u_cp, "
        + ", ".join(_pettitt_out_sql(T, D, thresh))
        + " FROM act JOIN agg ON act.cx = agg.cx AND act.cy = agg.cy"
    )


def pettitt_cells(
    df: DataFrame,
    cell_deg: float,
    t0_us: int,
    bin_us: int,
    n_bins: int,
    alpha: float = 0.05,
    ts_us: str = "ts_us",
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Pettitt change-point per cell (see :func:`pettitt_cells_sql`).
    The sen_slope plan family: ONE corpus hash aggregation to (cell,
    bin) counts, a bounded T-literal cube fan-out, the cell-keyed cube
    self-join (T² rows/cell) for V, one cell-keyed prefix-sum window
    for U, and one final per-cell aggregation — the counts exchange is
    AQE-reused across the active/cube branches."""
    _grid_params(cell_deg)
    _mk_params(t0_us, bin_us, n_bins)
    T = int(n_bins)
    D, thresh = _pettitt_consts(T, alpha)
    _, cx, cy = cell_id_sql(cell_deg, lon, lat)
    binx = _bin_sql(ts_us, t0_us, bin_us)
    c = (
        df.selectExpr(f"{cx} AS cx", f"{cy} AS cy", f"{binx} AS b")
        .filter(f"b >= 0 AND b < {T}")
        .groupBy("cx", "cy", "b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    )
    act = c.groupBy("cx", "cy").agg(
        F.sum("x").cast("bigint").alias("n_events")
    )
    bins = ", ".join(str(b) for b in range(T))
    cube = (
        act.selectExpr("cx", "cy", f"explode(array({bins})) AS b")
        .selectExpr("cx", "cy", "CAST(b AS BIGINT) AS b")
        .join(c, ["cx", "cy", "b"], "left")
        .selectExpr(
            "cx", "cy", "b", "CAST(coalesce(x, 0) AS BIGINT) AS x"
        )
    )
    a = cube.selectExpr("cx", "cy", "b AS b1", "x AS x1")
    b2 = cube.selectExpr("cx", "cy", "b AS b2", "x AS x2")
    v = (
        a.join(b2, ["cx", "cy"])
        .groupBy("cx", "cy", "b1")
        .agg(
            F.expr(
                "CAST(sum(CASE WHEN x1 > x2 THEN 1 "
                "WHEN x1 < x2 THEN -1 ELSE 0 END) AS BIGINT)"
            ).alias("v")
        )
        .withColumnRenamed("b1", "b")
    )
    w = (
        Window.partitionBy("cx", "cy")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = v.withColumn("u", F.sum("v").over(w).cast("bigint"))
    key = f"(-abs(u)) * {T} + b"
    agg = (
        u.filter(f"b <= {T - 2}")
        .groupBy("cx", "cy")
        .agg(
            F.expr("CAST(max(abs(u)) AS BIGINT)").alias("k_stat"),
            F.expr(f"CAST(min_by(b, {key}) AS BIGINT)").alias("cp_bin"),
            F.expr(f"CAST(min_by(u, {key}) AS BIGINT)").alias("u_cp"),
        )
    )
    return act.join(agg, ["cx", "cy"]).selectExpr(
        "cx AS cell_x", "cy AS cell_y", "n_events",
        "k_stat", "cp_bin", "u_cp",
        *_pettitt_out_sql(T, D, thresh),
    )


# ------------------------------ SNHT homogeneity test per cell --


def _snht_params(n_bins: int, t_crit: float) -> int:
    """T >= 4 (a meaningful split needs >= 2 bins each side at the
    extremes) and a positive published critical value. t0_stat has no
    closed-form null distribution — Alexandersson 1986 / Khaliq &
    Ouarda 2007 tabulate the percentage points by simulation — so the
    significance threshold is a PARAMETER the caller reads off those
    tables (e.g. ~7.4 at T=15, 95%), never derived here."""
    T = int(n_bins)
    if T < 4:
        raise ValueError(
            f"n_bins must be >= 4 for a meaningful change point, "
            f"got {n_bins}"
        )
    if not float(t_crit) > 0.0:
        raise ValueError(f"t_crit must be > 0, got {t_crit}")
    return T


def _snht_out_sql(T: int, t_crit: float) -> tuple:
    """Shared projection (t0_stat, shift) over (rmax, a_cp, bvar):
    T0 = rmax·T/B with rmax = max_t A_t²/(k(T−k)) and B = T·Σx² − S²
    (population-variance standardization, Alexandersson's original
    form: T·s² = B/T). B = 0 (constant series) leaves T0 undefined →
    NULL / 'none'. The significance decision compares the UNROUNDED
    identical-expression double against the published-table literal;
    a_cp > 0 means the pre-change mean sits ABOVE the series mean, so
    the level DECREASED."""
    t0 = (
        f"(rmax * {T}.0E0 / CAST(bvar AS DOUBLE))"
    )
    sig = f"(bvar > 0 AND {t0} >= {_pf(float(t_crit))})"
    return (
        f"(CASE WHEN bvar > 0 THEN round({t0}, 6) END) AS t0_stat",
        f"(CASE WHEN {sig} AND a_cp > 0 THEN 'decreasing' "
        f"WHEN {sig} AND a_cp < 0 THEN 'increasing' "
        f"ELSE 'none' END) AS shift",
    )


def snht_cells_sql(
    src_sql: str,
    cell_deg: float,
    t0_us: int,
    bin_us: int,
    n_bins: int,
    t_crit: float,
    ts_us: str = "ts_us",
    lon: str = "lon",
    lat: str = "lat",
) -> str:
    """Per-cell standard normal homogeneity test (Alexandersson 1986)
    of binned event counts — the PARAMETRIC abrupt-shift companion to
    :func:`pettitt_cells` (Pettitt ranks, SNHT standardizes; running
    both is the standard climate-homogenization practice, cf. the
    HOME/COST-ES0601 intercomparison).

    With prefix sums S_k over the zero-filled T-bin series,
    T(t) = k·z̄₁² + (T−k)·z̄₂² collapses to A_t²·T/(B·k(T−k)) where
    A_t = T·S_k − k·S and B = T·Σx² − S² are EXACT BIGINTs (population
    variance, the original SNHT form) — so the statistic needs only
    ONE prefix-sum window over the bounded cube, no pair join (the
    O(T) cheap sibling of Pettitt's O(T²)). T0 = max_t T(t); the
    change point is the earliest argmax of the engine-identical
    double ratio A²/(k(T−k)) (max-then-equality-join, the focal-family
    precedent — every engine computes the identical correctly-rounded
    division, so equality is deterministic). Significance compares T0
    against the caller's published-table critical value
    (:func:`_snht_params`).

    Output: one row per cell with >= 1 event in [t0, t0 + T·bin):
    (cell_x, cell_y, n_events, t0_stat, cp_bin, a_cp, shift); cp_bin
    is the last bin of the pre-change segment (NULL for constant
    series), t0_stat round(.,6).
    """
    _grid_params(cell_deg)
    _mk_params(t0_us, bin_us, n_bins)
    T = _snht_params(n_bins, t_crit)
    _, cx, cy = cell_id_sql(cell_deg, lon, lat)
    binx = _bin_sql(ts_us, t0_us, bin_us)
    bvals = ", ".join(f"({b})" for b in range(T))
    ratio = (
        f"(CAST(a * a AS DOUBLE) "
        f"/ CAST((b + 1) * ({T} - b - 1) AS DOUBLE))"
    )
    return (
        f"WITH ev AS (SELECT {cx} AS cx, {cy} AS cy, {binx} AS b "
        f"FROM ({src_sql}) s), "
        f"c AS (SELECT cx, cy, b, CAST(count(*) AS BIGINT) AS x "
        f"FROM ev WHERE b >= 0 AND b < {T} GROUP BY 1, 2, 3), "
        f"act AS (SELECT cx, cy, CAST(sum(x) AS BIGINT) AS s, "
        f"CAST({T} * sum(x * x) - sum(x) * sum(x) AS BIGINT) AS bvar "
        f"FROM c GROUP BY 1, 2), "
        f"bins(b) AS (VALUES {bvals}), "
        f"cube0 AS (SELECT act.cx, act.cy, "
        f"CAST(bins.b AS BIGINT) AS b, "
        f"CAST(coalesce(c.x, 0) AS BIGINT) AS x "
        f"FROM act CROSS JOIN bins "
        f"LEFT JOIN c ON c.cx = act.cx AND c.cy = act.cy "
        f"AND c.b = CAST(bins.b AS BIGINT)), "
        f"pre AS (SELECT cx, cy, b, "
        f"CAST(sum(x) OVER (PARTITION BY cx, cy ORDER BY b "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
        f"AS BIGINT) AS sk FROM cube0), "
        f"u AS (SELECT pre.cx, pre.cy, pre.b, "
        f"CAST({T} * pre.sk - (pre.b + 1) * act.s AS BIGINT) AS a "
        f"FROM pre JOIN act ON pre.cx = act.cx AND pre.cy = act.cy "
        f"WHERE pre.b <= {T - 2}), "
        f"mx AS (SELECT cx, cy, max({ratio}) AS rmax "
        f"FROM u GROUP BY 1, 2), "
        f"cp AS (SELECT u.cx, u.cy, "
        f"CAST(min(u.b) AS BIGINT) AS cp_bin, "
        f"CAST(min_by(u.a, u.b) AS BIGINT) AS a_cp, min(mx.rmax) AS rmax "
        f"FROM u JOIN mx ON u.cx = mx.cx AND u.cy = mx.cy "
        f"AND {ratio} = mx.rmax GROUP BY 1, 2) "
        f"SELECT act.cx AS cell_x, act.cy AS cell_y, "
        f"act.s AS n_events, "
        f"(CASE WHEN bvar > 0 THEN cp.cp_bin END) AS cp_bin, "
        f"(CASE WHEN bvar > 0 THEN cp.a_cp END) AS a_cp, "
        + ", ".join(_snht_out_sql(T, t_crit))
        + " FROM act JOIN cp ON act.cx = cp.cx AND act.cy = cp.cy"
    )


def snht_cells(
    df: DataFrame,
    cell_deg: float,
    t0_us: int,
    bin_us: int,
    n_bins: int,
    t_crit: float,
    ts_us: str = "ts_us",
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """SNHT per cell (see :func:`snht_cells_sql`). The cheap sibling of
    :func:`pettitt_cells`: ONE corpus hash aggregation to (cell, bin)
    counts, the bounded T-literal cube fan-out, one cell-keyed
    prefix-sum window, the per-cell ratio max, and the equality join
    back for the earliest argmax — no pair join anywhere (O(T) rows
    per cell end to end); the counts exchange is AQE-reused across the
    active/cube/argmax branches."""
    _grid_params(cell_deg)
    _mk_params(t0_us, bin_us, n_bins)
    T = _snht_params(n_bins, t_crit)
    _, cx, cy = cell_id_sql(cell_deg, lon, lat)
    binx = _bin_sql(ts_us, t0_us, bin_us)
    c = (
        df.selectExpr(f"{cx} AS cx", f"{cy} AS cy", f"{binx} AS b")
        .filter(f"b >= 0 AND b < {T}")
        .groupBy("cx", "cy", "b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    )
    act = c.groupBy("cx", "cy").agg(
        F.sum("x").cast("bigint").alias("s"),
        F.expr(
            f"CAST({T} * sum(x * x) - sum(x) * sum(x) AS BIGINT)"
        ).alias("bvar"),
    )
    bins = ", ".join(str(b) for b in range(T))
    cube = (
        act.selectExpr("cx", "cy", f"explode(array({bins})) AS b")
        .selectExpr("cx", "cy", "CAST(b AS BIGINT) AS b")
        .join(c, ["cx", "cy", "b"], "left")
        .selectExpr(
            "cx", "cy", "b", "CAST(coalesce(x, 0) AS BIGINT) AS x"
        )
    )
    w = (
        Window.partitionBy("cx", "cy")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = (
        cube.withColumn("sk", F.sum("x").over(w).cast("bigint"))
        .filter(f"b <= {T - 2}")
        .join(act.select("cx", "cy", "s"), ["cx", "cy"])
        .selectExpr(
            "cx", "cy", "b",
            f"CAST({T} * sk - (b + 1) * s AS BIGINT) AS a",
        )
    )
    ratio = (
        f"(CAST(a * a AS DOUBLE) "
        f"/ CAST((b + 1) * ({T} - b - 1) AS DOUBLE))"
    )
    mx = u.groupBy("cx", "cy").agg(
        F.expr(f"max({ratio})").alias("rmax")
    )
    cp = (
        u.join(mx, ["cx", "cy"])
        .filter(F.expr(f"{ratio} = rmax"))
        .groupBy("cx", "cy")
        .agg(
            F.expr("CAST(min(b) AS BIGINT)").alias("cp_bin"),
            F.expr("CAST(min_by(a, b) AS BIGINT)").alias("a_cp"),
            F.min("rmax").alias("rmax"),
        )
    )
    return act.join(cp, ["cx", "cy"]).selectExpr(
        "cx AS cell_x", "cy AS cell_y", "s AS n_events",
        "(CASE WHEN bvar > 0 THEN cp_bin END) AS cp_bin",
        "(CASE WHEN bvar > 0 THEN a_cp END) AS a_cp",
        *_snht_out_sql(T, t_crit),
    )


# ------------------------- FDR-corrected hotspots (BH over Gi*) --


def _norm_sf2_sql(zcol: str) -> str:
    """Two-sided normal tail 2·(1−Φ(|z|)) via the Abramowitz-Stegun
    26.2.17 rational-polynomial approximation (|error| < 7.5e-8 —
    far inside the round-6 quantum for any p that matters): Horner
    over t = 1/(1 + 0.2316419·|z|) times φ(|z|) = exp(−z²/2)/√(2π).
    One SHARED string, so both engines evaluate the identical
    expression tree; every op but exp is IEEE-correctly-rounded, and
    exp is the accepted libm precedent (spacetime_scan's ln). All
    constants emitted in E-notation (the fixtures._f convention)."""
    az = f"abs({zcol})"
    t = f"(1.0E0 / (1.0E0 + 2.316419E-1 * {az}))"
    poly = (
        f"((((1.330274429E0 * {t} - 1.821255978E0) * {t} "
        f"+ 1.781477937E0) * {t} - 3.56563782E-1) * {t} "
        f"+ 3.19381530E-1)"
    )
    phi = (
        f"(exp(-({az}) * ({az}) / 2.0E0) "
        f"* 3.9894228040143268E-1)"
    )
    return f"(2.0E0 * {phi} * {poly} * {t})"


def _fdr_exprs(q: float) -> tuple:
    """Shared (rank-layer exprs, step-up expr) applied over the Gi* rows
    (cell_x, cell_y, nbr_sum, w_size, gi_z) — the Benjamini-Hochberg
    step-up at level q. Rank ordering uses the EXACT round-6 gi_z
    (|z| descending == p ascending, p monotone in |z|), never the
    transcendental p, so ranks are engine-identical by construction;
    the step-up compares the ROUND-6 p against i·q/m (identical
    shared doubles; the only cross-engine risk is the accepted
    half-ulp exp boundary). The two unbounded windows run on ONE
    partition — bounded by the LATTICE, never the corpus
    (the spacetime_scan single-reducer posture)."""
    if not 0.0 < q < 1.0:
        raise ValueError(f"q must be in (0, 1), got {q}")
    p = f"round({_norm_sf2_sql('gi_z')}, 6)"
    order = "ORDER BY abs(gi_z) DESC, cell_x, cell_y"
    rank_exprs = [
        "cell_x", "cell_y", "nbr_sum", "gi_z",
        f"{p} AS p_value",
        f"CAST(row_number() OVER ({order}) AS BIGINT) AS p_rank",
        "CAST(count(*) OVER () AS BIGINT) AS m_tests",
    ]
    # second layer (windows cannot nest): the BH step-up max
    imax_expr = (
        f"CAST(max(CASE WHEN p_value <= CAST(p_rank AS DOUBLE) "
        f"* {_pf(q)} / CAST(m_tests AS DOUBLE) "
        f"THEN p_rank ELSE 0 END) OVER () AS BIGINT) AS i_max"
    )
    return rank_exprs, imax_expr


_FDR_LABEL = (
    "(CASE WHEN p_rank <= i_max AND gi_z > 0.0E0 THEN 'hot' "
    "WHEN p_rank <= i_max AND gi_z < 0.0E0 THEN 'cold' "
    "ELSE 'not significant' END) AS label"
)


def hotspot_fdr_sql(
    src_sql: str,
    cell_deg: float,
    lat0: float,
    lat1: float,
    q: float = 0.05,
    lon: str = "lon",
    lat: str = "lat",
) -> str:
    """Gi* hotspots with Benjamini-Hochberg FDR correction — the
    multiple-testing discipline ArcGIS "Optimized Hot Spot Analysis"
    applies on top of plain Gi* (reference `/root/reference` has
    neither; raw 5% cutoffs over thousands of lattice cells guarantee
    false hotspots, ~n_cells·0.05 of them). BH step-up: sort the m
    tested cells by p ascending (== |z| descending), find the largest
    i with p_(i) ≤ i·q/m, reject ranks 1..i_max. m = the WINDOWED
    cells Gi* emits (empty-window cells are untested noise, per
    :func:`getis_ord_gi_sql`), documented.

    Output: (cell_x, cell_y, nbr_sum, gi_z, p_value, p_rank, m_tests,
    label) with label in {'hot','cold','not significant'}.
    """
    gi = getis_ord_gi_sql(src_sql, cell_deg, lat0, lat1, lon, lat)
    rank_exprs, imax_expr = _fdr_exprs(q)
    return (
        f"WITH gi AS ({gi}), "
        f"ranked AS (SELECT {', '.join(rank_exprs)} FROM gi), "
        f"stepped AS (SELECT *, {imax_expr} FROM ranked) "
        f"SELECT cell_x, cell_y, nbr_sum, gi_z, p_value, p_rank, "
        f"m_tests, {_FDR_LABEL} FROM stepped"
    )


def hotspot_fdr(
    df: DataFrame,
    cell_deg: float,
    lat0: float,
    lat1: float,
    q: float = 0.05,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """FDR-corrected hotspots (see :func:`hotspot_fdr_sql`). Plan: the
    getis_ord_gi plan (1 corpus hash agg, bounded 9-offset scatter,
    broadcast moment join) + one single-partition lattice-sized window
    stage for the BH ranks — the corpus never reaches the window."""
    gi = getis_ord_gi(df, cell_deg, lat0, lat1, lon, lat)
    rank_exprs, imax_expr = _fdr_exprs(q)
    return (
        gi.selectExpr(*rank_exprs)
        .selectExpr("*", imax_expr)
        .selectExpr(
            "cell_x", "cell_y", "nbr_sum", "gi_z", "p_value",
            "p_rank", "m_tests", _FDR_LABEL,
        )
    )


# -------------------------------- location quotient per cell --


def location_quotient_sql(
    src_sql: str,
    cat: str,
    cell_deg: float,
    lon: str = "lon",
    lat: str = "lat",
) -> str:
    """Per-(cell, category) location quotient — the regional-science
    concentration ratio (Isserman 1977; the retail/epidemiology
    staple): LQ = (n_ci/n_i) / (N_c/N) = n_ci·N / (n_i·N_c), the
    cell's category share over the global share. LQ > 1: the category
    over-concentrates in that cell. The ASYMMETRIC nearest-neighbor
    colocation quotient (:func:`~.trajectory.colocation_quotient`)
    answers point-level association; LQ answers areal concentration —
    both belong to the standard category-association toolbox.

    All four counts stay exact BIGINTs; the single double expression
    n_ci·N / (n_i·N_c) is one correctly-rounded division of exact
    products (headroom: n_ci·N < 2^63 — 3e9 events globally at 1e9 per
    cell-category, far past any lattice), round(.,6).

    Output: (cell_x, cell_y, category, n_events, cell_total,
    cat_total, lq) for every (cell, category) with >= 1 event.
    """
    _grid_params(cell_deg)
    _, cx, cy = cell_id_sql(cell_deg, lon, lat)
    return (
        f"WITH c AS (SELECT {cx} AS cx, {cy} AS cy, "
        f"({cat}) AS category, CAST(count(*) AS BIGINT) AS n_ci "
        f"FROM ({src_sql}) s GROUP BY 1, 2, 3), "
        f"w AS (SELECT cx, cy, category, n_ci, "
        f"CAST(sum(n_ci) OVER (PARTITION BY cx, cy) AS BIGINT) AS n_i, "
        f"CAST(sum(n_ci) OVER (PARTITION BY category) AS BIGINT) AS n_c, "
        f"CAST(sum(n_ci) OVER () AS BIGINT) AS n FROM c) "
        f"SELECT cx AS cell_x, cy AS cell_y, category, "
        f"n_ci AS n_events, n_i AS cell_total, n_c AS cat_total, "
        f"round(CAST(n_ci * n AS DOUBLE) "
        f"/ CAST(n_i * n_c AS DOUBLE), 6) AS lq "
        f"FROM w"
    )


def location_quotient(
    df: DataFrame,
    cat: str,
    cell_deg: float,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Location quotient per cell (see :func:`location_quotient_sql`).
    DataFrame plan: ONE corpus hash aggregation to the (cell, category)
    table, then the same three marginal windows as the oracle twin —
    they run over the lattice×categories table, never the corpus (the
    joins-and-broadcasts alternative re-executed the corpus scan per
    marginal branch, 4 FileScans in the executed plan — measured and
    rejected; the single-partition global window is the spacetime_scan
    lattice-bounded posture)."""
    _grid_params(cell_deg)
    _, cx, cy = cell_id_sql(cell_deg, lon, lat)
    c = (
        df.selectExpr(
            f"{cx} AS cx", f"{cy} AS cy", f"({cat}) AS category"
        )
        .groupBy("cx", "cy", "category")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_ci"))
    )
    return c.selectExpr(
        "cx", "cy", "category", "n_ci",
        "CAST(sum(n_ci) OVER (PARTITION BY cx, cy) AS BIGINT) AS n_i",
        "CAST(sum(n_ci) OVER (PARTITION BY category) AS BIGINT) AS n_c",
        "CAST(sum(n_ci) OVER () AS BIGINT) AS n",
    ).selectExpr(
        "cx AS cell_x", "cy AS cell_y", "category",
        "n_ci AS n_events", "n_i AS cell_total", "n_c AS cat_total",
        "round(CAST(n_ci * n AS DOUBLE) "
        "/ CAST(n_i * n_c AS DOUBLE), 6) AS lq",
    )


# ----------------------------- gliding-box lacunarity --


def _lac_params(sizes: list, nx: int, ny: int) -> list:
    """Validate gliding-box sizes: positive ascending ints, every box
    must fit the lat band (r <= ny) and wrap collision-free in lon
    (nx >= r: the r column offsets 0..r−1 must be distinct mod nx, the
    focal-window argument — below that a box folds onto itself and
    masses silently double-count)."""
    rs = [int(r) for r in sizes]
    if not rs or any(r < 1 for r in rs) or any(
        b <= a for a, b in zip(rs, rs[1:])
    ):
        raise ValueError(
            f"sizes must be positive strictly-ascending ints, "
            f"got {sizes}"
        )
    if rs[-1] > ny:
        raise ValueError(
            f"box size {rs[-1]} exceeds the {ny}-row lat band"
        )
    if nx < rs[-1]:
        raise ValueError(
            f"box size {rs[-1]} needs nx >= {rs[-1]} lon cells for a "
            f"collision-free wrap; got nx={nx} — shrink cell_deg"
        )
    return rs


def lacunarity_sql(
    src_sql: str,
    sizes: list,
    cell_deg: float,
    lat0: float,
    lat1: float,
    lon: str = "lon",
    lat: str = "lat",
) -> str:
    """Gliding-box lacunarity Λ(r) (Allain & Cloitre 1991; Plotnick
    1996 — the multi-scale GAPPINESS statistic landscape ecology runs
    beside fractal dimension): over every r×r box position on the
    study lattice (lon anchors wrap, lat anchors keep the box inside
    the band), Λ(r) = n_boxes·ΣM² / (ΣM)² = 1 + var(M)/mean(M)² with
    M the box event mass. Λ = 1: translation-invariant mass; large Λ:
    the same density arrives in clumps-and-voids at that scale —
    discriminates patterns Ripley/quadrat read as identical.

    EMPTY boxes count (the classic estimator bias trap): n_boxes =
    nx·(ny−r+1) is CLOSED FORM, and ΣM/ΣM² over non-empty anchors
    equal the all-anchor sums (empty boxes add 0), so zero cells never
    materialize. Each cell scatters to its ≤ r² covering anchors
    (bounded literal explode, every (cell, anchor) pair exactly once —
    :func:`_lac_params`); per-r sums are conditional aggregates of the
    ONE scatter join, all BIGINT-exact until the single double
    division. Headroom: ΣM² <= n_boxes·(total events)², documented.

    Output: one row per size (box_cells, n_boxes, sum_mass,
    sum_mass_sq, lacunarity round6; NULL Λ for an eventless band).
    """
    nx, _, _ = _grid_params(cell_deg)
    cy0, cy1 = _lat_band(cell_deg, lat0, lat1)
    ny = cy1 - cy0
    rs = _lac_params(sizes, nx, ny)
    counts = _counts_sql(src_sql, cell_deg, cy0, cy1, lon, lat)
    offs = ", ".join(
        f"({r}, {dx}, {dy})"
        for r in rs for dx in range(r) for dy in range(r)
    )
    nbox = {r: nx * (ny - r + 1) for r in rs}
    rvals = ", ".join(f"({r}, {nbox[r]})" for r in rs)
    return (
        f"WITH counts AS ({counts}), "
        f"offs(r, dx, dy) AS (VALUES {offs}), "
        f"scat AS (SELECT o.r, "
        f"((c.cx - o.dx + {nx}) % {nx}) AS ax, "
        f"(c.cy - o.dy) AS ay, c.cnt "
        f"FROM counts c CROSS JOIN offs o "
        f"WHERE (c.cy - o.dy) >= {cy0} "
        f"AND (c.cy - o.dy) + o.r - 1 < {cy1}), "
        f"mass AS (SELECT r, ax, ay, CAST(sum(cnt) AS BIGINT) AS m "
        f"FROM scat GROUP BY 1, 2, 3), "
        f"rt(box_cells, n_boxes) AS (VALUES {rvals}), "
        f"agg AS (SELECT rt.box_cells, "
        f"CAST(rt.n_boxes AS BIGINT) AS n_boxes, "
        f"CAST(coalesce(sum(mass.m), 0) AS BIGINT) AS sum_mass, "
        f"CAST(coalesce(sum(mass.m * mass.m), 0) AS BIGINT) "
        f"AS sum_mass_sq "
        f"FROM rt LEFT JOIN mass ON mass.r = rt.box_cells "
        f"GROUP BY 1, 2) "
        f"SELECT CAST(box_cells AS INT) AS box_cells, n_boxes, "
        f"sum_mass, sum_mass_sq, "
        f"round(CAST(n_boxes AS DOUBLE) "
        f"* CAST(sum_mass_sq AS DOUBLE) "
        f"/ nullif(CAST(sum_mass AS DOUBLE) "
        f"* CAST(sum_mass AS DOUBLE), 0.0E0), 6) AS lacunarity "
        f"FROM agg"
    )


def lacunarity(
    df: DataFrame,
    sizes: list,
    cell_deg: float,
    lat0: float,
    lat1: float,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Gliding-box lacunarity (see :func:`lacunarity_sql`). Plan: ONE
    corpus hash aggregation to the cell table, one bounded Σr²-offset
    Generate + (r, anchor) aggregate, one Σ-bounded final aggregate —
    the corpus never reaches the scatter."""
    nx, _, _ = _grid_params(cell_deg)
    cy0, cy1 = _lat_band(cell_deg, lat0, lat1)
    ny = cy1 - cy0
    rs = _lac_params(sizes, nx, ny)
    _, cx, cy = cell_id_sql(cell_deg, lon, lat)
    counts = (
        df.selectExpr(f"{cx} AS cx", f"{cy} AS cy")
        .filter(f"cy >= {cy0} AND cy < {cy1}")
        .groupBy("cx", "cy")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    offs = ", ".join(
        f"struct({r} AS r, {dx} AS dx, {dy} AS dy)"
        for r in rs for dx in range(r) for dy in range(r)
    )
    mass = (
        counts.selectExpr(
            f"explode(array({offs})) AS o", "cx", "cy", "cnt"
        )
        .filter(
            f"(cy - o.dy) >= {cy0} AND (cy - o.dy) + o.r - 1 < {cy1}"
        )
        .selectExpr(
            "o.r AS r", f"((cx - o.dx + {nx}) % {nx}) AS ax",
            "(cy - o.dy) AS ay", "cnt",
        )
        .groupBy("r", "ax", "ay")
        .agg(F.sum("cnt").cast("bigint").alias("m"))
    )
    nbox = {r: nx * (ny - r + 1) for r in rs}
    agg = mass.agg(*[
        F.expr(e).alias(n)
        for r in rs
        for e, n in (
            (f"CAST(coalesce(sum(CASE WHEN r = {r} THEN m END), 0) "
             f"AS BIGINT)", f"s{r}"),
            (f"CAST(coalesce(sum(CASE WHEN r = {r} THEN m * m END), "
             f"0) AS BIGINT)", f"q{r}"),
        )
    ])
    outs = ", ".join(
        f"struct({r} AS box_cells, "
        f"CAST({nbox[r]} AS BIGINT) AS n_boxes, s{r} AS sum_mass, "
        f"q{r} AS sum_mass_sq)"
        for r in rs
    )
    return agg.selectExpr(f"explode(array({outs})) AS s").selectExpr(
        "s.box_cells AS box_cells", "s.n_boxes AS n_boxes",
        "s.sum_mass AS sum_mass", "s.sum_mass_sq AS sum_mass_sq",
        "round(CAST(s.n_boxes AS DOUBLE) "
        "* CAST(s.sum_mass_sq AS DOUBLE) "
        "/ nullif(CAST(s.sum_mass AS DOUBLE) "
        "* CAST(s.sum_mass AS DOUBLE), 0.0E0), 6) AS lacunarity",
    )


# ------------------------------- Moran correlogram (ring lags) --


def _ring_rowsum(cy: int, d: int, cy0: int, cy1: int) -> int:
    """Ring row sum: # lattice neighbors at Chebyshev distance exactly
    d from a cell in lat row cy (lon wraps — every dx column exists;
    lat rows clip at the band). The dy = ±d rows contribute 2d+1 cells
    each; every other in-band dy row contributes the 2 side columns
    dx = ±d."""
    lo = max(-d, cy0 - cy)
    hi = min(d, cy1 - 1 - cy)
    if hi < lo:
        return 0
    top = 1 if hi == d else 0
    bottom = 1 if lo == -d else 0
    interior = (hi - lo + 1) - top - bottom
    return (2 * d + 1) * (top + bottom) + 2 * interior


def _correlogram_consts(
    max_lag: int, cell_deg: float, lat0: float, lat1: float
) -> tuple:
    """(nx, cy0, cy1, n, per-lag dict of (W, S1, S2, A, B, denom)):
    the compile-time Cliff-Ord randomization constants per ring lag —
    W_d = ΣW rowsums, S1 = 2W (symmetric binary weights), S2 =
    4·Σ rowsum² — and the variance building blocks
    A = (n²−3n+3)S1 − nS2 + 3W², B = (n²−n)S1 − 2nS2 + 6W²,
    denom = (n−1)(n−2)(n−3)W², all exact Python ints emitted as
    shared double literals."""
    D = int(max_lag)
    if D < 1:
        raise ValueError(f"max_lag must be >= 1, got {max_lag}")
    nx, _, _ = _grid_params(cell_deg)
    _check_window_nx(nx, D)
    cy0, cy1 = _lat_band(cell_deg, lat0, lat1)
    ny = cy1 - cy0
    if ny < 2:
        raise ValueError(
            f"the correlogram needs at least 2 lat rows, got {ny}"
        )
    n = nx * ny
    if n < 4:
        raise ValueError(
            f"randomization variance needs n >= 4 cells, got {n}"
        )
    consts = {}
    for d in range(1, D + 1):
        rows = [_ring_rowsum(cy, d, cy0, cy1) for cy in range(cy0, cy1)]
        w = nx * sum(rows)
        if w == 0:
            raise ValueError(
                f"lag {d} has no in-band neighbor pairs "
                f"(ny={ny}) — lower max_lag"
            )
        s1 = 2 * w
        s2 = 4 * nx * sum(r * r for r in rows)
        a = (n * n - 3 * n + 3) * s1 - n * s2 + 3 * w * w
        b = (n * n - n) * s1 - 2 * n * s2 + 6 * w * w
        denom = (n - 1) * (n - 2) * (n - 3) * w * w
        consts[d] = (w, s1, s2, a, b, denom)
    return nx, cy0, cy1, n, consts


def _ring_rowsum_sql(d: int, cy0: int, cy1: int) -> str:
    """The :func:`_ring_rowsum` closed form as shared integer SQL over
    column ``cy`` (greatest/least/CASE only — engine-identical)."""
    lo = f"greatest(-{d}, {cy0} - cy)"
    hi = f"least({d}, {cy1 - 1} - cy)"
    top = f"(CASE WHEN {hi} = {d} THEN 1 ELSE 0 END)"
    bot = f"(CASE WHEN {lo} = -{d} THEN 1 ELSE 0 END)"
    inter = f"(({hi} - {lo} + 1) - {top} - {bot})"
    return (
        f"(CASE WHEN {hi} < {lo} THEN 0 ELSE "
        f"{2 * d + 1} * ({top} + {bot}) + 2 * {inter} END)"
    )


def _correlogram_lag_out(n: int, d: int, c: tuple) -> dict:
    """Per-lag output expressions over the shared moment columns
    (m1..m4, rsum{d}, psum{d}): Moran's I expanded around exact
    integer moments, E[I] = −1/(n−1), the Cliff & Ord (1981)
    randomization variance Var[I] = (n·A − b2·B)/denom − E², with
    b2 = n·Σ(x−m)⁴/Σ(x−m)²² from the raw-moment expansion
    m4c = m4 − 4m·m3 + 6m²·m2 − 3n·m⁴ (the general_g headroom note
    applies to m4). Every constant is a shared compile-time literal;
    the only data doubles are the casts of exact BIGINTs."""
    w, s1, s2, a, b, denom = c
    nn = f"{n}.0E0"
    m = f"(CAST(m1 AS DOUBLE) / {nn})"
    m2c = f"(CAST(m2 AS DOUBLE) - {nn} * {m} * {m})"
    m4c = (
        f"(CAST(m4 AS DOUBLE) - 4.0E0 * {m} * CAST(m3 AS DOUBLE) "
        f"+ 6.0E0 * {m} * {m} * CAST(m2 AS DOUBLE) "
        f"- 3.0E0 * {nn} * {m} * {m} * {m} * {m})"
    )
    b2 = f"({nn} * {m4c} / nullif({m2c} * {m2c}, 0.0E0))"
    num = (
        f"(CAST(psum{d} AS DOUBLE) "
        f"- 2.0E0 * {m} * CAST(rsum{d} AS DOUBLE) "
        f"+ {m} * {m} * {_pf(float(w))})"
    )
    i_ = f"(({nn} / {_pf(float(w))}) * {num} / nullif({m2c}, 0.0E0))"
    e_i = -1.0 / (n - 1)
    var = (
        f"(({nn} * {_pf(float(a))} - {b2} * {_pf(float(b))}) "
        f"/ {_pf(float(denom))} - {_pf(e_i * e_i)})"
    )
    z = f"(({i_} - {_pf(e_i)}) / nullif(sqrt({var}), 0.0E0))"
    return {
        "lag": f"{d}",
        "w_sum": f"CAST({w} AS BIGINT)",
        "rsum": f"rsum{d}",
        "psum": f"psum{d}",
        "morans_i": f"round({i_}, 6)",
        "e_i": f"{_pf(e_i)}",
        "var_i": f"round({var}, 6)",
        "z": f"round({z}, 6)",
        "pattern": (
            f"(CASE WHEN {z} >= 1.96E0 THEN 'clustered' "
            f"WHEN {z} <= -1.96E0 THEN 'dispersed' "
            f"ELSE 'random' END)"
        ),
    }


def moran_correlogram_sql(
    src_sql: str,
    max_lag: int,
    cell_deg: float,
    lat0: float,
    lat1: float,
    lon: str = "lon",
    lat: str = "lat",
) -> str:
    """Spatial correlogram: global Moran's I per Chebyshev ring lag
    d = 1..max_lag (spdep's ``sp.correlogram`` — the scale-profile
    companion to :func:`morans_i`: a single-lag I cannot say at WHAT
    distance autocorrelation dies; the correlogram's sign changes and
    decay range do). Weights at lag d are binary on the square ring
    max(|dx|,|dy|) = d (lon wraps, lat clips), so each lag is a
    disjoint weight matrix — I(d) decomposes scale by scale.

    One dialect-shared string: the per-lag pair sums come from ONE
    ring scatter (Σ8d bounded offsets) joined back to the present
    cells, as conditional sums; the per-lag row-sum moments use the
    closed-form in-band ring row count (:func:`_ring_rowsum_sql`);
    raw moments m1..m4 stay exact BIGINTs (the general_g m4 headroom
    note). Inference per lag: E[I] = −1/(n−1) and the full Cliff-Ord
    randomization variance with compile-time lattice constants
    (:func:`_correlogram_consts`), z, and a two-sided 5% label.

    Output: one row per lag (lag, w_sum, rsum, psum, morans_i, e_i,
    var_i, z, pattern); floats round(.,6), NULL for a constant
    surface."""
    nx, cy0, cy1, n, consts = _correlogram_consts(
        max_lag, cell_deg, lat0, lat1
    )
    D = int(max_lag)
    counts = _counts_sql(src_sql, cell_deg, cy0, cy1, lon, lat)
    offs = ", ".join(
        f"({d}, {dx}, {dy})"
        for d in range(1, D + 1)
        for dx in range(-d, d + 1) for dy in range(-d, d + 1)
        if max(abs(dx), abs(dy)) == d
    )
    psums = ", ".join(
        f"CAST(coalesce(sum(CASE WHEN s.d = {d} THEN s.cnt * t.cnt "
        f"END), 0) AS BIGINT) AS psum{d}"
        for d in range(1, D + 1)
    )
    rsums = ", ".join(
        f"CAST(sum({_ring_rowsum_sql(d, cy0, cy1)} * cnt) AS BIGINT) "
        f"AS rsum{d}"
        for d in range(1, D + 1)
    )
    branches = []
    for d in range(1, D + 1):
        o = _correlogram_lag_out(n, d, consts[d])
        sel = ", ".join(f"{e} AS {k}" for k, e in o.items())
        branches.append(f"SELECT {sel} FROM mm")
    return (
        f"WITH counts AS ({counts}), "
        f"offs(d, dx, dy) AS (VALUES {offs}), "
        f"scat AS (SELECT o.d, ((c.cx + o.dx + {nx}) % {nx}) AS tx, "
        f"(c.cy + o.dy) AS ty, c.cnt "
        f"FROM counts c CROSS JOIN offs o "
        f"WHERE (c.cy + o.dy) >= {cy0} AND (c.cy + o.dy) < {cy1}), "
        f"pair AS (SELECT {psums} "
        f"FROM scat s JOIN counts t ON s.tx = t.cx AND s.ty = t.cy), "
        f"mom AS (SELECT CAST(coalesce(sum(cnt), 0) AS BIGINT) AS m1, "
        f"CAST(coalesce(sum(cnt * cnt), 0) AS BIGINT) AS m2, "
        f"CAST(coalesce(sum(cnt * cnt * cnt), 0) AS BIGINT) AS m3, "
        f"CAST(coalesce(sum(cnt * cnt * cnt * cnt), 0) AS BIGINT) "
        f"AS m4, {rsums} FROM counts), "
        f"mm AS (SELECT * FROM mom CROSS JOIN pair) "
        + " UNION ALL ".join(branches)
    )


def moran_correlogram(
    df: DataFrame,
    max_lag: int,
    cell_deg: float,
    lat0: float,
    lat1: float,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Moran correlogram (see :func:`moran_correlogram_sql`). Plan: ONE
    corpus hash aggregation to the cell table, one bounded Σ8d-offset
    Generate + the cell-sized pair join (ALL lags share it via
    conditional sums), 1-row moment aggregates, and a bounded literal
    unpivot — the morans_i plan with the lag riding every key."""
    nx, cy0, cy1, n, consts = _correlogram_consts(
        max_lag, cell_deg, lat0, lat1
    )
    D = int(max_lag)
    _, cx, cy = cell_id_sql(cell_deg, lon, lat)
    counts = (
        df.selectExpr(f"{cx} AS cx", f"{cy} AS cy")
        .filter(f"cy >= {cy0} AND cy < {cy1}")
        .groupBy("cx", "cy")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    offs = ", ".join(
        f"struct({d} AS d, {dx} AS dx, {dy} AS dy)"
        for d in range(1, D + 1)
        for dx in range(-d, d + 1) for dy in range(-d, d + 1)
        if max(abs(dx), abs(dy)) == d
    )
    scat = counts.selectExpr(
        f"explode(array({offs})) AS o", "cx", "cy", "cnt"
    ).selectExpr(
        "o.d AS d", f"((cx + o.dx + {nx}) % {nx}) AS tx",
        "(cy + o.dy) AS ty", "cnt AS scnt",
    ).filter(f"ty >= {cy0} AND ty < {cy1}")
    pair = scat.join(
        counts, (scat.tx == counts.cx) & (scat.ty == counts.cy)
    ).agg(*[
        F.expr(
            f"CAST(coalesce(sum(CASE WHEN d = {d} THEN scnt * cnt "
            f"END), 0) AS BIGINT)"
        ).alias(f"psum{d}")
        for d in range(1, D + 1)
    ])
    mom = counts.agg(
        F.expr("CAST(coalesce(sum(cnt), 0) AS BIGINT)").alias("m1"),
        F.expr(
            "CAST(coalesce(sum(cnt * cnt), 0) AS BIGINT)"
        ).alias("m2"),
        F.expr(
            "CAST(coalesce(sum(cnt * cnt * cnt), 0) AS BIGINT)"
        ).alias("m3"),
        F.expr(
            "CAST(coalesce(sum(cnt * cnt * cnt * cnt), 0) AS BIGINT)"
        ).alias("m4"),
        *[
            F.expr(
                f"CAST(sum({_ring_rowsum_sql(d, cy0, cy1)} * cnt) "
                f"AS BIGINT)"
            ).alias(f"rsum{d}")
            for d in range(1, D + 1)
        ],
    )
    stk = []
    for d in range(1, D + 1):
        o = _correlogram_lag_out(n, d, consts[d])
        inner = ", ".join(f"{e} AS {k}" for k, e in o.items())
        stk.append(f"struct({inner})")
    cols = list(_correlogram_lag_out(n, 1, consts[1]))
    return (
        mom.crossJoin(F.broadcast(pair))
        .selectExpr(f"explode(array({', '.join(stk)})) AS s")
        .selectExpr(*[f"s.{k} AS {k}" for k in cols])
    )


# ---------------------------- Morisita dispersion index --


def _morisita_out_sql(n_cells: int) -> tuple:
    """Shared projection over (sx, sxx): Morisita's I_δ =
    Q·Σx(x−1)/(N(N−1)) (Σx(x−1) = sxx − sx, exact BIGINT) and the
    negative-binomial clumping parameter by moments,
    k̂ = m²/(s² − m) with population variance s² = sxx/Q − m² — NULL
    when the pattern is not over-dispersed (s² <= m: k undefined, the
    Poisson/regular regime) or N < 2."""
    q = f"{n_cells}.0E0"
    m = f"(CAST(sx AS DOUBLE) / {q})"
    s2 = f"(CAST(sxx AS DOUBLE) / {q} - {m} * {m})"
    nn1 = "(CAST(sx AS DOUBLE) * (CAST(sx AS DOUBLE) - 1.0E0))"
    i_d = (
        f"({q} * CAST(sxx - sx AS DOUBLE) / nullif({nn1}, 0.0E0))"
    )
    k = (
        f"(CASE WHEN {s2} > {m} THEN "
        f"{m} * {m} / ({s2} - {m}) END)"
    )
    return (
        f"round({i_d}, 6) AS morisita",
        f"round({k}, 6) AS nb_k",
    )


def morisita_index_sql(
    src_sql: str,
    cell_deg: float,
    lat0: float,
    lat1: float,
    lon: str = "lon",
    lat: str = "lat",
) -> str:
    """Morisita's dispersion index I_δ (Morisita 1959) + the moment
    negative-binomial clumping parameter k̂ over the fixed quadrat
    lattice — the density-INVARIANT companions to
    :func:`quadrat_csr_sql`'s VMR: random thinning moves the VMR
    toward 1 but leaves I_δ (a probability ratio of co-occurrence)
    and k (the NB shape) unchanged, which is why ecology reports them
    beside the chi². I_δ = Q·Σx(x−1)/(N(N−1)) — the ratio of observed
    same-quadrat co-draws to the CSR expectation (1 = random,
    > 1 clustered, max Q when everything stacks in one cell);
    k̂ = m²/(s²−m), small k = heavy clumping, k → ∞ = Poisson.

    Both reduce to the same two exact BIGINT moments (Σx, Σx²) the
    quadrat test uses — one corpus pass, closed-form doubles, empty
    cells via the compile-time Q. Output: one row (n_cells, n_events,
    morisita, nb_k); NULLs for N < 2 / non-over-dispersed k."""
    nx, _, _ = _grid_params(cell_deg)
    cy0, cy1 = _lat_band(cell_deg, lat0, lat1)
    n_cells = nx * (cy1 - cy0)
    if n_cells < 2:
        raise ValueError("study lattice needs at least 2 cells")
    counts = _counts_sql(src_sql, cell_deg, cy0, cy1, lon, lat)
    return (
        f"WITH counts AS ({counts}), "
        f"mom AS (SELECT CAST(coalesce(sum(cnt), 0) AS BIGINT) AS sx, "
        f"CAST(coalesce(sum(cnt * cnt), 0) AS BIGINT) AS sxx "
        f"FROM counts) "
        f"SELECT CAST({n_cells} AS BIGINT) AS n_cells, "
        f"sx AS n_events, "
        + ", ".join(_morisita_out_sql(n_cells))
        + " FROM mom"
    )


def morisita_index(
    df: DataFrame,
    cell_deg: float,
    lat0: float,
    lat1: float,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Morisita I_δ + NB k̂ (see :func:`morisita_index_sql`). Plan: ONE
    corpus hash aggregation to cells, one 1-row moment aggregate —
    the quadrat_csr plan with a different closing projection."""
    nx, _, _ = _grid_params(cell_deg)
    cy0, cy1 = _lat_band(cell_deg, lat0, lat1)
    n_cells = nx * (cy1 - cy0)
    if n_cells < 2:
        raise ValueError("study lattice needs at least 2 cells")
    _, cx, cy = cell_id_sql(cell_deg, lon, lat)
    mom = (
        df.selectExpr(f"{cx} AS cx", f"{cy} AS cy")
        .filter(f"cy >= {cy0} AND cy < {cy1}")
        .groupBy("cx", "cy")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .agg(
            F.expr("CAST(coalesce(sum(cnt), 0) AS BIGINT)").alias("sx"),
            F.expr(
                "CAST(coalesce(sum(cnt * cnt), 0) AS BIGINT)"
            ).alias("sxx"),
        )
    )
    return mom.selectExpr(
        f"CAST({n_cells} AS BIGINT) AS n_cells",
        "sx AS n_events",
        *_morisita_out_sql(n_cells),
    )


# -------------------------- per-cell category diversity --


def _diversity_out_sql() -> tuple:
    """Shared projection over (n_i, richness, slnl, snn1): Shannon H'
    = ln(n) − Σc·ln(c)/n (nats, the ecology convention; ln is the
    accepted libm precedent and the per-cell sum has ≤ #categories
    terms — the word_entropy posture) and the UNBIASED Simpson / PIE
    index 1 − Σc(c−1)/(n(n−1)) (Hurlbert 1971) whose numerator and
    denominator are exact BIGINTs. NULL for single-event cells."""
    n = "CAST(n_i AS DOUBLE)"
    return (
        f"round(CASE WHEN n_i >= 2 THEN ln({n}) - slnl / {n} END, 6) "
        f"AS shannon",
        f"round(CASE WHEN n_i >= 2 THEN 1.0E0 - CAST(snn1 AS DOUBLE) "
        f"/ ({n} * ({n} - 1.0E0)) END, 6) AS simpson",
    )


def cell_diversity_sql(
    src_sql: str,
    cat: str,
    cell_deg: float,
    lon: str = "lon",
    lat: str = "lat",
) -> str:
    """Per-cell category diversity — the areal diversity profile
    (species diversity per quadrat in ecology; land-use mix in urban
    analytics): Shannon H' (nats), the unbiased Simpson/PIE
    probability-of-interspecific-encounter, and richness (distinct
    categories). :func:`location_quotient_sql` asks WHERE a category
    concentrates; diversity asks how MIXED each cell is — the other
    half of the composition toolbox.

    One corpus aggregation to (cell, category); per-cell Simpson stays
    exact-BIGINT (Σc(c−1), n(n−1)); Shannon's Σc·ln(c) is a ≤
    #categories-term double sum (the word_entropy round-6 posture).
    Output: (cell_x, cell_y, n_events, richness, shannon, simpson);
    diversity NULL for single-event cells."""
    _grid_params(cell_deg)
    _, cx, cy = cell_id_sql(cell_deg, lon, lat)
    return (
        f"WITH c AS (SELECT {cx} AS cx, {cy} AS cy, "
        f"({cat}) AS category, CAST(count(*) AS BIGINT) AS n_ci "
        f"FROM ({src_sql}) s GROUP BY 1, 2, 3), "
        f"agg AS (SELECT cx, cy, "
        f"CAST(sum(n_ci) AS BIGINT) AS n_i, "
        f"CAST(count(*) AS BIGINT) AS richness, "
        f"sum(CAST(n_ci AS DOUBLE) * ln(CAST(n_ci AS DOUBLE))) "
        f"AS slnl, "
        f"CAST(sum(n_ci * (n_ci - 1)) AS BIGINT) AS snn1 "
        f"FROM c GROUP BY 1, 2) "
        f"SELECT cx AS cell_x, cy AS cell_y, n_i AS n_events, "
        f"richness, "
        + ", ".join(_diversity_out_sql())
        + " FROM agg"
    )


def cell_diversity(
    df: DataFrame,
    cat: str,
    cell_deg: float,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Per-cell category diversity (see :func:`cell_diversity_sql`).
    Plan: one corpus hash aggregation to (cell, category), one
    cell-keyed aggregate — two map-side-combined exchanges, nothing
    wider than the lattice×categories table after the first."""
    _grid_params(cell_deg)
    _, cx, cy = cell_id_sql(cell_deg, lon, lat)
    c = (
        df.selectExpr(
            f"{cx} AS cx", f"{cy} AS cy", f"({cat}) AS category"
        )
        .groupBy("cx", "cy", "category")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_ci"))
    )
    agg = c.groupBy("cx", "cy").agg(
        F.sum("n_ci").cast("bigint").alias("n_i"),
        F.count(F.lit(1)).cast("bigint").alias("richness"),
        F.expr(
            "sum(CAST(n_ci AS DOUBLE) * ln(CAST(n_ci AS DOUBLE)))"
        ).alias("slnl"),
        F.expr(
            "CAST(sum(n_ci * (n_ci - 1)) AS BIGINT)"
        ).alias("snn1"),
    )
    return agg.selectExpr(
        "cx AS cell_x", "cy AS cell_y", "n_i AS n_events",
        "richness", *_diversity_out_sql(),
    )


# ------------------------------ segregation indices per category --


def segregation_indices_sql(
    src_sql: str,
    cat: str,
    cell_deg: float,
    lon: str = "lon",
    lat: str = "lat",
) -> str:
    """Per-category residential-segregation indices vs the complement
    (Duncan & Duncan 1955; Massey & Denton's evenness + exposure
    dimensions — the standard demography/urban-analytics pair):

    * dissimilarity D = ½ Σ_i |x_i/X − y_i/Y| — the share of the
      category that would have to move to even out. Computed EXACTLY:
      over the common denominator, D = (Σ_i |x_i·Y − y_i·X|) / (2XY)
      whose numerator is an exact BIGINT sum; cells where the category
      is ABSENT (x_i = 0, never materialized) contribute X·(Y − Σ_present
      y_i) in closed form, so the zero cells never exist. Headroom:
      x_i·Y < 2^63 caps the corpus at ~4e9 events, documented.
    * isolation xPx = Σ_i (x_i/X)(x_i/t_i) — the expected own-group
      share met by a random member (absent cells contribute 0); a
      ≤ n_cells-term double sum (the word_entropy round-6 posture).
      Interaction with the rest is its complement 1 − xPx.

    One corpus aggregation to (cell, category); marginals via
    lattice-bounded windows. Output: one row per category (category,
    cat_total, rest_total, dissimilarity, isolation); D NULL when the
    complement is empty (single-category corpus)."""
    _grid_params(cell_deg)
    _, cx, cy = cell_id_sql(cell_deg, lon, lat)
    return (
        f"WITH c AS (SELECT {cx} AS cx, {cy} AS cy, "
        f"({cat}) AS category, CAST(count(*) AS BIGINT) AS x "
        f"FROM ({src_sql}) s GROUP BY 1, 2, 3), "
        f"w AS (SELECT cx, cy, category, x, "
        f"CAST(sum(x) OVER (PARTITION BY cx, cy) AS BIGINT) AS t, "
        f"CAST(sum(x) OVER (PARTITION BY category) AS BIGINT) AS xt, "
        f"CAST(sum(x) OVER () AS BIGINT) AS n FROM c), "
        f"agg AS (SELECT category, "
        f"CAST(min(xt) AS BIGINT) AS cat_total, "
        f"CAST(min(n - xt) AS BIGINT) AS rest_total, "
        f"CAST(sum(abs(x * (n - xt) - (t - x) * xt)) AS BIGINT) "
        f"AS a_sum, "
        f"CAST(sum(t - x) AS BIGINT) AS b_sum, "
        f"sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) "
        f"/ CAST(t AS DOUBLE)) AS iso_num "
        f"FROM w GROUP BY category) "
        f"SELECT category, cat_total, rest_total, "
        f"round(CAST(a_sum + cat_total * (rest_total - b_sum) "
        f"AS DOUBLE) / nullif(2.0E0 * CAST(cat_total AS DOUBLE) "
        f"* CAST(rest_total AS DOUBLE), 0.0E0), 6) AS dissimilarity, "
        f"round(iso_num / CAST(cat_total AS DOUBLE), 6) AS isolation "
        f"FROM agg"
    )


def segregation_indices(
    df: DataFrame,
    cat: str,
    cell_deg: float,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Segregation indices (see :func:`segregation_indices_sql`).
    Plan: one corpus hash aggregation to (cell, category), the three
    lattice-bounded marginal windows (the location_quotient posture),
    one category-keyed aggregate."""
    _grid_params(cell_deg)
    _, cx, cy = cell_id_sql(cell_deg, lon, lat)
    c = (
        df.selectExpr(
            f"{cx} AS cx", f"{cy} AS cy", f"({cat}) AS category"
        )
        .groupBy("cx", "cy", "category")
        .agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    )
    w = c.selectExpr(
        "cx", "cy", "category", "x",
        "CAST(sum(x) OVER (PARTITION BY cx, cy) AS BIGINT) AS t",
        "CAST(sum(x) OVER (PARTITION BY category) AS BIGINT) AS xt",
        "CAST(sum(x) OVER () AS BIGINT) AS n",
    )
    agg = w.groupBy("category").agg(
        F.expr("CAST(min(xt) AS BIGINT)").alias("cat_total"),
        F.expr("CAST(min(n - xt) AS BIGINT)").alias("rest_total"),
        F.expr(
            "CAST(sum(abs(x * (n - xt) - (t - x) * xt)) AS BIGINT)"
        ).alias("a_sum"),
        F.expr("CAST(sum(t - x) AS BIGINT)").alias("b_sum"),
        F.expr(
            "sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) "
            "/ CAST(t AS DOUBLE))"
        ).alias("iso_num"),
    )
    return agg.selectExpr(
        "category", "cat_total", "rest_total",
        "round(CAST(a_sum + cat_total * (rest_total - b_sum) "
        "AS DOUBLE) / nullif(2.0E0 * CAST(cat_total AS DOUBLE) "
        "* CAST(rest_total AS DOUBLE), 0.0E0), 6) AS dissimilarity",
        "round(iso_num / CAST(cat_total AS DOUBLE), 6) AS isolation",
    )


# ------------------------- spatial concentration (Gini/Hoover/Theil) --


def spatial_concentration_sql(
    src_sql: str,
    cell_deg: float,
    lat0: float,
    lat1: float,
    lon: str = "lon",
    lat: str = "lat",
) -> str:
    """Spatial concentration of the event surface over the fixed
    lattice — the inequality scalars regional science reports beside
    the dispersion indices (how UNEQUAL is the allocation, as opposed
    to how CLUMPED — a checkerboard is maximally dispersed yet highly
    unequal):

    * Gini G = (2·Σ rank_i·x_i − (n+1)·N)/(n·N) over counts sorted
      ascending — EXACT: zero cells occupy the first n−K ranks and
      contribute nothing, so each present cell's effective rank is
      (n−K) + its row_number among present cells (ties of equal x are
      rank-order invariant in the sum); everything BIGINT until one
      division.
    * Hoover (Robin Hood) H = ½Σ|x_i/N − 1/n| = the share of events
      that must move for uniformity = (Σ_present |n·x_i − N| +
      (n−K)·N)/(2nN) — common-denominator exact, absent cells closed
      form (the segregation-D trick).
    * Theil T = Σ(x_i/N)·ln(x_i/m), m = N/n — zero cells contribute 0
      (x·ln x → 0), reduces to (Σx·ln x)/N − ln(m) (double sum, the
      word_entropy round-6 posture).

    One corpus aggregation, one lattice-bounded rank window, one 1-row
    aggregate. Output: (n_cells, n_events, gini, hoover, theil);
    NULL for an empty band."""
    nx, _, _ = _grid_params(cell_deg)
    cy0, cy1 = _lat_band(cell_deg, lat0, lat1)
    n_cells = nx * (cy1 - cy0)
    if n_cells < 2:
        raise ValueError("study lattice needs at least 2 cells")
    counts = _counts_sql(src_sql, cell_deg, cy0, cy1, lon, lat)
    n = f"{n_cells}.0E0"
    return (
        f"WITH counts AS ({counts}), "
        f"rk AS (SELECT cnt, CAST(row_number() OVER "
        f"(ORDER BY cnt, cx, cy) AS BIGINT) AS r, "
        f"CAST(count(*) OVER () AS BIGINT) AS k, "
        f"CAST(sum(cnt) OVER () AS BIGINT) AS stot FROM counts), "
        f"agg AS (SELECT CAST(sum(cnt) AS BIGINT) AS sx, "
        f"CAST(min(k) AS BIGINT) AS k, "
        f"CAST(sum(({n_cells} - k + r) * cnt) AS BIGINT) AS srx, "
        f"CAST(sum(abs({n_cells} * cnt - stot)) "
        f"AS BIGINT) AS habs, "
        f"sum(CAST(cnt AS DOUBLE) * ln(CAST(cnt AS DOUBLE))) AS slnl "
        f"FROM rk) "
        f"SELECT CAST({n_cells} AS BIGINT) AS n_cells, "
        f"sx AS n_events, "
        f"round((2.0E0 * CAST(srx AS DOUBLE) "
        f"- ({n} + 1.0E0) * CAST(sx AS DOUBLE)) "
        f"/ nullif({n} * CAST(sx AS DOUBLE), 0.0E0), 6) AS gini, "
        f"round((CAST(habs AS DOUBLE) "
        f"+ ({n} - CAST(k AS DOUBLE)) * CAST(sx AS DOUBLE)) "
        f"/ nullif(2.0E0 * {n} * CAST(sx AS DOUBLE), 0.0E0), 6) "
        f"AS hoover, "
        f"round(slnl / nullif(CAST(sx AS DOUBLE), 0.0E0) "
        f"- ln(CAST(sx AS DOUBLE) / {n}), 6) AS theil "
        f"FROM agg"
    )


def spatial_concentration(
    df: DataFrame,
    cell_deg: float,
    lat0: float,
    lat1: float,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Gini/Hoover/Theil concentration (see
    :func:`spatial_concentration_sql`). Plan: one corpus hash agg to
    cells, one lattice-bounded single-partition rank window (the
    spacetime_scan posture), one 1-row aggregate."""
    nx, _, _ = _grid_params(cell_deg)
    cy0, cy1 = _lat_band(cell_deg, lat0, lat1)
    n_cells = nx * (cy1 - cy0)
    if n_cells < 2:
        raise ValueError("study lattice needs at least 2 cells")
    _, cx, cy = cell_id_sql(cell_deg, lon, lat)
    counts = (
        df.selectExpr(f"{cx} AS cx", f"{cy} AS cy")
        .filter(f"cy >= {cy0} AND cy < {cy1}")
        .groupBy("cx", "cy")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    rk = counts.selectExpr(
        "cnt",
        "CAST(row_number() OVER (ORDER BY cnt, cx, cy) AS BIGINT) AS r",
        "CAST(count(*) OVER () AS BIGINT) AS k",
        "CAST(sum(cnt) OVER () AS BIGINT) AS stot",
    )
    agg = rk.agg(
        F.expr("CAST(sum(cnt) AS BIGINT)").alias("sx"),
        F.expr("CAST(min(k) AS BIGINT)").alias("k"),
        F.expr(
            f"CAST(sum(({n_cells} - k + r) * cnt) AS BIGINT)"
        ).alias("srx"),
        F.expr(
            f"CAST(sum(abs({n_cells} * cnt - stot)) AS BIGINT)"
        ).alias("habs"),
        F.expr(
            "sum(CAST(cnt AS DOUBLE) * ln(CAST(cnt AS DOUBLE)))"
        ).alias("slnl"),
    )
    n = f"{n_cells}.0E0"
    return agg.selectExpr(
        f"CAST({n_cells} AS BIGINT) AS n_cells",
        "sx AS n_events",
        f"round((2.0E0 * CAST(srx AS DOUBLE) "
        f"- ({n} + 1.0E0) * CAST(sx AS DOUBLE)) "
        f"/ nullif({n} * CAST(sx AS DOUBLE), 0.0E0), 6) AS gini",
        f"round((CAST(habs AS DOUBLE) "
        f"+ ({n} - CAST(k AS DOUBLE)) * CAST(sx AS DOUBLE)) "
        f"/ nullif(2.0E0 * {n} * CAST(sx AS DOUBLE), 0.0E0), 6) "
        f"AS hoover",
        f"round(slnl / nullif(CAST(sx AS DOUBLE), 0.0E0) "
        f"- ln(CAST(sx AS DOUBLE) / {n}), 6) AS theil",
    )


# ------------------------------ seasonal chi-square per cell --


def _schi_params(n_seasons: int, chi2_crit: float) -> int:
    """P >= 2 seasons; the chi-square critical value at df = P−1 is a
    PARAMETER read off the published table (e.g. 5.991 at df=2, 95%;
    the SNHT t_crit convention — no quantile function is derived)."""
    P = int(n_seasons)
    if P < 2:
        raise ValueError(f"n_seasons must be >= 2, got {n_seasons}")
    if not float(chi2_crit) > 0.0:
        raise ValueError(f"chi2_crit must be > 0, got {chi2_crit}")
    return P


def seasonal_chi2_cells_sql(
    src_sql: str,
    cell_deg: float,
    t0_us: int,
    bin_us: int,
    n_bins: int,
    n_seasons: int,
    chi2_crit: float,
    ts_us: str = "ts_us",
    lon: str = "lon",
    lat: str = "lat",
) -> str:
    """Per-cell chi-square test of SEASONALITY: are the cell's events
    uniform across the P season-of-cycle bins (bin % P), or does the
    cell carry a seasonal cycle? The classic goodness-of-fit
    seasonality screen (the chi-square companion of Edwards' 1961
    harmonic test) — and the diagnostic that says whether
    seasonal_mk's season stratification is doing anything for a cell.

    With season totals x_s (s = 0..P−1, zero seasons never
    materialized — they enter through the closed form) and n = Σx_s:
    chi² = Σ_s (x_s − n/P)²/(n/P) = (P·Σx_s² − n²)/n EXACTLY — two
    BIGINT moments, one double division. Peak season = earliest argmax
    via the exact total-order min_by key (−x_s)·P + s. The label
    compares against the caller's published-table critical value at
    df = P−1 (:func:`_schi_params`). Requires n_bins % n_seasons == 0
    (a partial cycle biases every season total, the seasonal_mk rule).

    Output: one row per cell with >= 1 in-window event: (cell_x,
    cell_y, n_events, chi2, peak_season, peak_count, seasonal);
    chi2 round(.,6)."""
    _grid_params(cell_deg)
    _mk_params(t0_us, bin_us, n_bins)
    P = _schi_params(n_seasons, chi2_crit)
    T = int(n_bins)
    if T % P != 0:
        raise ValueError(
            f"n_bins={T} must be a whole number of {P}-season cycles"
        )
    _, cx, cy = cell_id_sql(cell_deg, lon, lat)
    binx = _bin_sql(ts_us, t0_us, bin_us)
    key = f"(-x) * {P} + s"
    chi2 = (
        f"(CAST({P} * sxx - n_events * n_events AS DOUBLE) "
        f"/ CAST(n_events AS DOUBLE))"
    )
    sig = f"({chi2} >= {_pf(float(chi2_crit))})"
    return (
        f"WITH ev AS (SELECT {cx} AS cx, {cy} AS cy, "
        f"({binx}) % {P} AS s FROM ({src_sql}) q "
        f"WHERE ({binx}) >= 0 AND ({binx}) < {T}), "
        f"c AS (SELECT cx, cy, s, CAST(count(*) AS BIGINT) AS x "
        f"FROM ev GROUP BY 1, 2, 3), "
        f"agg AS (SELECT cx, cy, CAST(sum(x) AS BIGINT) AS n_events, "
        f"CAST(sum(x * x) AS BIGINT) AS sxx, "
        f"CAST(min_by(s, {key}) AS BIGINT) AS peak_season, "
        f"CAST(max(x) AS BIGINT) AS peak_count "
        f"FROM c GROUP BY 1, 2) "
        f"SELECT cx AS cell_x, cy AS cell_y, n_events, "
        f"round({chi2}, 6) AS chi2, peak_season, peak_count, "
        f"(CASE WHEN {sig} THEN 'seasonal' ELSE 'uniform' END) "
        f"AS seasonal FROM agg"
    )


def seasonal_chi2_cells(
    df: DataFrame,
    cell_deg: float,
    t0_us: int,
    bin_us: int,
    n_bins: int,
    n_seasons: int,
    chi2_crit: float,
    ts_us: str = "ts_us",
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Seasonality chi-square per cell (see
    :func:`seasonal_chi2_cells_sql`). Plan: ONE corpus hash
    aggregation to (cell, season) totals, one cell-keyed aggregate —
    zero seasons enter through the closed form (chi² needs only Σx²
    and n; absent seasons add 0 and the P divisor is compile-time),
    so nothing is ever zero-filled."""
    _grid_params(cell_deg)
    _mk_params(t0_us, bin_us, n_bins)
    P = _schi_params(n_seasons, chi2_crit)
    T = int(n_bins)
    if T % P != 0:
        raise ValueError(
            f"n_bins={T} must be a whole number of {P}-season cycles"
        )
    _, cx, cy = cell_id_sql(cell_deg, lon, lat)
    binx = _bin_sql(ts_us, t0_us, bin_us)
    c = (
        df.selectExpr(
            f"{cx} AS cx", f"{cy} AS cy", f"({binx}) AS b"
        )
        .filter(f"b >= 0 AND b < {T}")
        .selectExpr("cx", "cy", f"b % {P} AS s")
        .groupBy("cx", "cy", "s")
        .agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    )
    key = f"(-x) * {P} + s"
    agg = c.groupBy("cx", "cy").agg(
        F.sum("x").cast("bigint").alias("n_events"),
        F.expr("CAST(sum(x * x) AS BIGINT)").alias("sxx"),
        F.expr(f"CAST(min_by(s, {key}) AS BIGINT)").alias("peak_season"),
        F.expr("CAST(max(x) AS BIGINT)").alias("peak_count"),
    )
    chi2 = (
        f"(CAST({P} * sxx - n_events * n_events AS DOUBLE) "
        f"/ CAST(n_events AS DOUBLE))"
    )
    sig = f"({chi2} >= {_pf(float(chi2_crit))})"
    return agg.selectExpr(
        "cx AS cell_x", "cy AS cell_y", "n_events",
        f"round({chi2}, 6) AS chi2", "peak_season", "peak_count",
        f"(CASE WHEN {sig} THEN 'seasonal' ELSE 'uniform' END) "
        f"AS seasonal",
    )


# --------------------------------- local join counts (Anselin-Li) --


def _ljc_exprs(n_cells: int, cy0: int, cy1: int) -> dict:
    """Shared expressions over (cell_y, bb = hot neighbor count, p1 =
    total hot cells): conditional-permutation moments of the local BB
    join count. With x_i = 1 held fixed, the w_i neighbor slots are a
    simple random sample WITHOUT replacement from the other n−1 cells,
    of which p1−1 are hot — BB_i is hypergeometric(n−1, p1−1, w_i):

        E[BB]   = w·K/(n−1),                 K = p1 − 1
        Var[BB] = w·(K/(n−1))·(1 − K/(n−1))·(n−1−w)/(n−2)

    (the local_geary SRSWOR fpc, verified against exhaustive
    enumeration in tests). One-sided inference — join-count clustering
    is a HIGH-tail question (GeoDa's convention)."""
    n = n_cells
    w = (
        f"(CASE WHEN cell_y = {cy0} OR cell_y = {cy1 - 1} "
        f"THEN 5.0E0 ELSE 8.0E0 END)"
    )
    k = "(CAST(p1 AS DOUBLE) - 1.0E0)"
    nm1 = f"{n - 1}.0E0"
    pr = f"({k} / {nm1})"
    e = f"({w} * {pr})"
    var = (
        f"({w} * {pr} * (1.0E0 - {pr}) "
        f"* ({nm1} - {w}) / {n - 2}.0E0)"
    )
    z = f"((CAST(bb AS DOUBLE) - {e}) / nullif(sqrt({var}), 0.0E0))"
    return {
        "e": e,
        "z": z,
        "label": (
            f"(CASE WHEN {z} >= 1.645E0 THEN 'cluster' "
            f"ELSE 'none' END)"
        ),
    }


def local_join_counts_sql(
    src_sql: str,
    cell_deg: float,
    lat0: float,
    lat1: float,
    hot_pct: int = 110,
    lon: str = "lon",
    lat: str = "lat",
) -> str:
    """Local join count statistic (Anselin & Li 2019; GeoDa's
    "univariate local join count" — the LISA for BINARY fields, where
    Moran/Geary on a 0/1 surface lose their footing): per HOT cell,
    BB_i = Σ_j w_ij x_j counts hot neighbors, with the EXACT
    hypergeometric conditional-permutation moments
    (:func:`_ljc_exprs`) giving an analytic one-sided z.

    The binary marker is scale-free and integer-exact on BOTH engines:
    hot ⟺ 100·cnt·K ≥ hot_pct·N (cnt at least hot_pct% of the
    active-cell mean N/K) — no double threshold exists to mismatch.
    Empty lattice cells are never hot and never materialize; the
    conditional n is the FULL lattice (they are legitimate permutation
    slots).

    Output: one row per hot cell — (cell_x, cell_y, cnt, bb, n_hot,
    e_bb, z, label), z/e round(.,6), label 'cluster' at one-sided 5%
    (z >= 1.645). NULL z when every or no other cell is hot
    (degenerate hypergeometric)."""
    nx, cy0, cy1, n_cells, _ = _moran_lattice(cell_deg, lat0, lat1)
    if int(hot_pct) <= 0:
        raise ValueError(f"hot_pct must be positive, got {hot_pct}")
    counts = _counts_sql(src_sql, cell_deg, cy0, cy1, lon, lat)
    offs = ", ".join(
        f"({dx}, {dy})"
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)
        if not (dx == 0 and dy == 0)
    )
    ex = _ljc_exprs(n_cells, cy0, cy1)
    return (
        f"WITH counts AS ({counts}), "
        f"gmom AS (SELECT CAST(sum(cnt) AS BIGINT) AS nn, "
        f"CAST(count(*) AS BIGINT) AS kk FROM counts), "
        f"hot AS (SELECT c.cx, c.cy, c.cnt FROM counts c "
        f"CROSS JOIN gmom g "
        f"WHERE 100 * c.cnt * g.kk >= {int(hot_pct)} * g.nn), "
        f"p AS (SELECT CAST(count(*) AS BIGINT) AS p1 FROM hot), "
        f"offs(dx, dy) AS (VALUES {offs}), "
        f"scat AS (SELECT ((h.cx + o.dx + {nx}) % {nx}) AS tx, "
        f"(h.cy + o.dy) AS ty FROM hot h CROSS JOIN offs o "
        f"WHERE (h.cy + o.dy) >= {cy0} AND (h.cy + o.dy) < {cy1}), "
        f"nbr AS (SELECT tx, ty, CAST(count(*) AS BIGINT) AS bb "
        f"FROM scat GROUP BY tx, ty), "
        f"base AS (SELECT h.cx AS cell_x, h.cy AS cell_y, "
        f"h.cnt AS cnt, CAST(coalesce(n.bb, 0) AS BIGINT) AS bb, "
        f"p.p1 AS p1 FROM hot h "
        f"LEFT JOIN nbr n ON n.tx = h.cx AND n.ty = h.cy "
        f"CROSS JOIN p) "
        f"SELECT cell_x, cell_y, cnt, bb, p1 AS n_hot, "
        f"round({ex['e']}, 6) AS e_bb, "
        f"round({ex['z']}, 6) AS z, "
        f"{ex['label']} AS label FROM base"
    )


def local_join_counts(
    df: DataFrame,
    cell_deg: float,
    lat0: float,
    lat1: float,
    hot_pct: int = 110,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Local join counts (see :func:`local_join_counts_sql`). Plan: ONE
    corpus hash aggregation to cells; the hot filter broadcasts the
    1-row global moments; the 8-offset scatter, neighbor count, and
    the left join back all run on the HOT subset (≤ lattice-sized);
    p1 is another 1-row broadcast."""
    nx, cy0, cy1, n_cells, _ = _moran_lattice(cell_deg, lat0, lat1)
    if int(hot_pct) <= 0:
        raise ValueError(f"hot_pct must be positive, got {hot_pct}")
    _, cx, cy = cell_id_sql(cell_deg, lon, lat)
    counts = (
        df.selectExpr(f"{cx} AS cx", f"{cy} AS cy")
        .filter(f"cy >= {cy0} AND cy < {cy1}")
        .groupBy("cx", "cy")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    glob = counts.agg(
        F.sum("cnt").cast("bigint").alias("nn"),
        F.count(F.lit(1)).cast("bigint").alias("kk"),
    )
    hot = counts.crossJoin(F.broadcast(glob)).filter(
        f"100 * cnt * kk >= {int(hot_pct)} * nn"
    ).select("cx", "cy", "cnt")
    p = hot.agg(F.count(F.lit(1)).cast("bigint").alias("p1"))
    offs = ", ".join(
        f"struct({dx} AS dx, {dy} AS dy)"
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)
        if not (dx == 0 and dy == 0)
    )
    nbr = hot.selectExpr(
        f"explode(array({offs})) AS o", "cx", "cy"
    ).selectExpr(
        f"((cx + o.dx + {nx}) % {nx}) AS tx", "(cy + o.dy) AS ty"
    ).filter(f"ty >= {cy0} AND ty < {cy1}").groupBy("tx", "ty").agg(
        F.count(F.lit(1)).cast("bigint").alias("bb")
    )
    ex = _ljc_exprs(n_cells, cy0, cy1)
    base = (
        hot.join(
            nbr, (hot.cx == nbr.tx) & (hot.cy == nbr.ty), "left"
        )
        .crossJoin(F.broadcast(p))
        .selectExpr(
            "cx AS cell_x", "cy AS cell_y", "cnt",
            "CAST(coalesce(bb, 0) AS BIGINT) AS bb", "p1",
        )
    )
    return base.selectExpr(
        "cell_x", "cell_y", "cnt", "bb", "p1 AS n_hot",
        f"round({ex['e']}, 6) AS e_bb",
        f"round({ex['z']}, 6) AS z",
        f"{ex['label']} AS label",
    )


# ------------------------------ Empirical-Bayes smoothed rates --


def eb_rates_sql(
    src_sql: str,
    cat: str,
    case_value: str,
    cell_deg: float,
    lon: str = "lon",
    lat: str = "lat",
) -> str:
    """Per-cell raw + Empirical-Bayes-smoothed case rates (Marshall
    1991 global EB — GeoDa's "Empirical Bayes" rate smoother; THE
    standard answer to the small-denominator problem in disease
    mapping: a 1-case cell over a 2-event base screams rate 0.5 from
    pure noise). Cases = events whose ``cat`` equals ``case_value``;
    base = all events in the cell.

    Method-of-moments prior over the observed rates r_i = x_i/t_i:
    m = X/T (overall rate), v = Σt_i(r_i−m)²/T − m·K/T (truncated at
    0), shrinkage w_i = v/(v + m/t_i), θ_i = w_i·r_i + (1−w_i)·m —
    small-base cells shrink hardest; v ≤ 0 collapses every cell to m
    (the prior carries all the information). The moment sum runs over
    the per-cell EXACT BIGINT numerator (x_i·T − t_i·X)²: Σ of ≤
    n_cells double terms (word_entropy round-6 posture); everything
    else is exact until one division.

    Output: one row per cell with >= 1 event — (cell_x, cell_y,
    cases, base, raw_rate, eb_rate, shrink_w), floats round(.,6)."""
    _grid_params(cell_deg)
    _, cx, cy = cell_id_sql(cell_deg, lon, lat)
    case = f"(CASE WHEN ({cat}) = {case_value} THEN 1 ELSE 0 END)"
    tt = "CAST(tot.t AS DOUBLE)"
    xx = "CAST(tot.x AS DOUBLE)"
    m = f"({xx} / {tt})"
    v = (
        f"(vsum.s / {tt} - {m} * CAST(tot.k AS DOUBLE) / {tt})"
    )
    vc = f"greatest(0.0E0, {v})"
    w = (
        f"({vc} / nullif({vc} + {m} / CAST(c.t_i AS DOUBLE), 0.0E0))"
    )
    r = "(CAST(c.x_i AS DOUBLE) / CAST(c.t_i AS DOUBLE))"
    return (
        f"WITH c AS (SELECT {cx} AS cx, {cy} AS cy, "
        f"CAST(sum({case}) AS BIGINT) AS x_i, "
        f"CAST(count(*) AS BIGINT) AS t_i "
        f"FROM ({src_sql}) s GROUP BY 1, 2), "
        f"tot AS (SELECT CAST(sum(x_i) AS BIGINT) AS x, "
        f"CAST(sum(t_i) AS BIGINT) AS t, "
        f"CAST(count(*) AS BIGINT) AS k FROM c), "
        f"vsum AS (SELECT sum(CAST((c.x_i * tot.t - c.t_i * tot.x) "
        f"AS DOUBLE) * CAST((c.x_i * tot.t - c.t_i * tot.x) "
        f"AS DOUBLE) / (CAST(c.t_i AS DOUBLE) "
        f"* CAST(tot.t AS DOUBLE) * CAST(tot.t AS DOUBLE))) AS s "
        f"FROM c CROSS JOIN tot) "
        f"SELECT c.cx AS cell_x, c.cy AS cell_y, c.x_i AS cases, "
        f"c.t_i AS base, "
        f"round({r}, 6) AS raw_rate, "
        f"round({w} * {r} + (1.0E0 - {w}) * {m}, 6) AS eb_rate, "
        f"round({w}, 6) AS shrink_w "
        f"FROM c CROSS JOIN tot CROSS JOIN vsum"
    )


def eb_rates(
    df: DataFrame,
    cat: str,
    case_value: str,
    cell_deg: float,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """EB-smoothed rates (see :func:`eb_rates_sql`). Plan: ONE corpus
    hash aggregation to (cell: cases, base); the prior moments are a
    1-row aggregate + a lattice-bounded moment sum, broadcast back —
    the corpus is scanned once."""
    _grid_params(cell_deg)
    _, cx, cy = cell_id_sql(cell_deg, lon, lat)
    case = f"(CASE WHEN ({cat}) = {case_value} THEN 1 ELSE 0 END)"
    c = (
        df.selectExpr(
            f"{cx} AS cx", f"{cy} AS cy", f"{case} AS is_case"
        )
        .groupBy("cx", "cy")
        .agg(
            F.expr("CAST(sum(is_case) AS BIGINT)").alias("x_i"),
            F.count(F.lit(1)).cast("bigint").alias("t_i"),
        )
    )
    tot = c.agg(
        F.sum("x_i").cast("bigint").alias("x"),
        F.sum("t_i").cast("bigint").alias("t"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    withtot = c.crossJoin(F.broadcast(tot))
    vsum = withtot.agg(
        F.expr(
            "sum(CAST((x_i * t - t_i * x) AS DOUBLE) "
            "* CAST((x_i * t - t_i * x) AS DOUBLE) "
            "/ (CAST(t_i AS DOUBLE) * CAST(t AS DOUBLE) "
            "* CAST(t AS DOUBLE)))"
        ).alias("s")
    )
    tt = "CAST(t AS DOUBLE)"
    xx = "CAST(x AS DOUBLE)"
    m = f"({xx} / {tt})"
    v = f"(s / {tt} - {m} * CAST(k AS DOUBLE) / {tt})"
    vc = f"greatest(0.0E0, {v})"
    w = f"({vc} / nullif({vc} + {m} / CAST(t_i AS DOUBLE), 0.0E0))"
    r = "(CAST(x_i AS DOUBLE) / CAST(t_i AS DOUBLE))"
    return (
        withtot.crossJoin(F.broadcast(vsum))
        .selectExpr(
            "cx AS cell_x", "cy AS cell_y", "x_i AS cases",
            "t_i AS base",
            f"round({r}, 6) AS raw_rate",
            f"round({w} * {r} + (1.0E0 - {w}) * {m}, 6) AS eb_rate",
            f"round({w}, 6) AS shrink_w",
        )
    )


# ------------------------------ Moran's I of a measured field --

_FLD_SCALE = 100  # 1e-2 value quantum (the semivariogram convention)


def _fld_out_exprs() -> list:
    """Output projection for the field Moran over the mm columns
    (n, w, s2, m1..m4, psum, rsum) — shared verbatim by the SQL twin
    and the DataFrame closing selectExpr (single source of truth for
    the whole inference expression tree)."""
    nn = "CAST(n AS DOUBLE)"
    ww = "CAST(w AS DOUBLE)"
    m = f"(CAST(m1 AS DOUBLE) / {nn})"
    m2c = f"(CAST(m2 AS DOUBLE) - {nn} * {m} * {m})"
    m4c = (
        f"(CAST(m4 AS DOUBLE) - 4.0E0 * {m} * CAST(m3 AS DOUBLE)"
        f" + 6.0E0 * {m} * {m} * CAST(m2 AS DOUBLE) "
        f"- 3.0E0 * {nn} * {m} * {m} * {m} * {m})"
    )
    b2 = f"({nn} * {m4c} / nullif({m2c} * {m2c}, 0.0E0))"
    s1 = f"(2.0E0 * {ww})"
    s2 = "CAST(s2 AS DOUBLE)"
    num = (
        f"(CAST(psum AS DOUBLE) "
        f"- 2.0E0 * {m} * CAST(rsum AS DOUBLE) + {m} * {m} * {ww})"
    )
    i_ = f"(({nn} / {ww}) * {num} / nullif({m2c}, 0.0E0))"
    e_i = f"(CASE WHEN n >= 2 THEN -1.0E0 / ({nn} - 1.0E0) END)"
    a_ = (
        f"(({nn} * {nn} - 3.0E0 * {nn} + 3.0E0) * {s1} "
        f"- {nn} * {s2} + 3.0E0 * {ww} * {ww})"
    )
    b_ = (
        f"(({nn} * {nn} - {nn}) * {s1} - 2.0E0 * {nn} * {s2} "
        f"+ 6.0E0 * {ww} * {ww})"
    )
    den = (
        f"(({nn} - 1.0E0) * ({nn} - 2.0E0) * ({nn} - 3.0E0) "
        f"* {ww} * {ww})"
    )
    var = (
        f"(CASE WHEN n >= 4 THEN "
        f"({nn} * {a_} - {b2} * {b_}) / {den} - {e_i} * {e_i} END)"
    )
    z = f"(({i_} - {e_i}) / nullif(sqrt({var}), 0.0E0))"
    return [
        "n AS n_cells",
        "w AS w_sum",
        f"round({i_}, 6) AS morans_i",
        f"round({e_i}, 6) AS e_i",
        f"round({var}, 6) AS var_i",
        f"round({z}, 6) AS z",
        f"(CASE WHEN {z} >= 1.96E0 THEN 'clustered' "
        f"WHEN {z} <= -1.96E0 THEN 'dispersed' "
        f"ELSE 'random' END) AS pattern",
    ]


def morans_i_field_sql(
    src_sql: str,
    value: str,
    cell_deg: float,
    lat0: float,
    lat1: float,
    lon: str = "lon",
    lat: str = "lat",
) -> str:
    """Global Moran's I of a measured FIELD (cell-mean of a value
    column) over the PRESENT cells — the textbook station-data form
    (temperature/pressure anomalies), where :func:`morans_i` is the
    count-surface form: empty cells carry no field value, so the
    weight graph is the 3x3-minus-self adjacency RESTRICTED to
    present cells and every lattice "constant" (n, W, S1, S2) becomes
    a data-dependent EXACT integer.

    Cell values are the per-cell mean quantized to BIGINT at 1e-2
    (exact half-up integer division — the focal_value_mean posture),
    so all moments (m1..m4, rsum, psum) are exact BIGINTs; W counts
    directed present pairs from the same scatter join that builds
    psum; S1 = 2W, S2 = Σ(2w_i)² with w_i the present-neighbor count.
    I expands around the integer moments exactly like
    :func:`moran_correlogram_sql`, and the inference is the same full
    Cliff-Ord randomization variance — computed from COLUMNS instead
    of compile-time literals (same algebra, exhaustively
    permutation-proven there; re-proven for this data-dependent form
    in pytest). m4 products run in DOUBLE past the BIGINT lane
    (local_geary note). Requires >= 4 present cells (randomization
    moments) — fewer cells yield NULL inference rather than an error
    (data-dependent, can't fail at plan time).

    Output: ONE row (n_cells, w_sum, morans_i, e_i, var_i, z,
    pattern); morans_i NULL for a constant field, z 'clustered' /
    'dispersed' / 'random' at two-sided 5%."""
    nx, _, _ = _grid_params(cell_deg)
    _check_window_nx(nx, 1)
    cy0, cy1 = _lat_band(cell_deg, lat0, lat1)
    _, cx, cy = cell_id_sql(cell_deg, lon, lat)
    offs = ", ".join(
        f"({dx}, {dy})"
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)
        if not (dx == 0 and dy == 0)
    )
    s = _FLD_SCALE
    # exact half-up integer mean of the 1e-2-quantized values
    # (focal_value_mean): floor((2*vsum + n) / (2*n))
    q = (
        f"CAST(floor((2.0E0 * CAST(vs AS DOUBLE) + CAST(nv AS DOUBLE))"
        f" / (2.0E0 * CAST(nv AS DOUBLE))) AS BIGINT)"
    )
    outs = ', '.join(_fld_out_exprs())
    return (
        f"WITH pts AS (SELECT {cx} AS cx, {cy} AS cy, "
        f"CAST(round(({value}) * {s}.0E0, 0) AS BIGINT) AS qv "
        f"FROM ({src_sql}) src "
        f"WHERE {cy} >= {cy0} AND {cy} < {cy1} "
        f"AND ({value}) IS NOT NULL), "
        f"cells AS (SELECT cx, cy, CAST(sum(qv) AS BIGINT) AS vs, "
        f"CAST(count(*) AS BIGINT) AS nv FROM pts GROUP BY 1, 2), "
        f"cv AS (SELECT cx, cy, {q} AS x FROM cells), "
        f"offs(dx, dy) AS (VALUES {offs}), "
        f"scat AS (SELECT ((c.cx + o.dx + {nx}) % {nx}) AS tx, "
        f"(c.cy + o.dy) AS ty, c.x FROM cv c CROSS JOIN offs o "
        f"WHERE (c.cy + o.dy) >= {cy0} AND (c.cy + o.dy) < {cy1}), "
        f"pair AS (SELECT t.cx, t.cy, "
        f"CAST(count(*) AS BIGINT) AS wi, "
        f"CAST(sum(s.x) AS BIGINT) AS nsum "
        f"FROM scat s JOIN cv t ON s.tx = t.cx AND s.ty = t.cy "
        f"GROUP BY 1, 2), "
        f"mm AS (SELECT CAST(count(*) AS BIGINT) AS n, "
        f"CAST(coalesce(sum(p.wi), 0) AS BIGINT) AS w, "
        f"CAST(coalesce(sum(4 * p.wi * p.wi), 0) AS BIGINT) AS s2, "
        f"CAST(sum(c.x) AS BIGINT) AS m1, "
        f"CAST(sum(c.x * c.x) AS BIGINT) AS m2, "
        f"CAST(sum(c.x * c.x * c.x) AS BIGINT) AS m3, "
        f"CAST(sum(c.x * c.x * c.x * c.x) AS BIGINT) AS m4, "
        f"CAST(coalesce(sum(c.x * p.nsum), 0) AS BIGINT) AS psum, "
        f"CAST(coalesce(sum(p.wi * c.x), 0) AS BIGINT) AS rsum "
        f"FROM cv c LEFT JOIN pair p ON p.cx = c.cx AND p.cy = c.cy) "
        f"SELECT {outs} FROM mm"
    )


def morans_i_field(
    df: DataFrame,
    value: str,
    cell_deg: float,
    lat0: float,
    lat1: float,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Field Moran's I (see :func:`morans_i_field_sql`). Plan: ONE
    corpus hash aggregation to cell means, the bounded 8-offset
    Generate + present-cell join building (w_i, neighbor sum) in one
    pass, a LEFT join back (isolated cells keep w_i = 0 — the lisa
    FULL-OUTER lesson, but here every scatter target that matters is a
    present cell), one 1-row moment aggregate, and the shared closing
    projection."""
    nx, _, _ = _grid_params(cell_deg)
    _check_window_nx(nx, 1)
    cy0, cy1 = _lat_band(cell_deg, lat0, lat1)
    _, cx, cy = cell_id_sql(cell_deg, lon, lat)
    s = _FLD_SCALE
    pts = df.filter(
        F.expr(f"({value}) IS NOT NULL")
    ).selectExpr(
        f"{cx} AS cx", f"{cy} AS cy",
        f"CAST(round(({value}) * {s}.0E0, 0) AS BIGINT) AS qv",
    ).filter(f"cy >= {cy0} AND cy < {cy1}")
    cells = pts.groupBy("cx", "cy").agg(
        F.sum("qv").cast("bigint").alias("vs"),
        F.count(F.lit(1)).cast("bigint").alias("nv"),
    )
    q = (
        "CAST(floor((2.0E0 * CAST(vs AS DOUBLE) + CAST(nv AS DOUBLE))"
        " / (2.0E0 * CAST(nv AS DOUBLE))) AS BIGINT)"
    )
    cv = cells.selectExpr("cx", "cy", f"{q} AS x")
    offs = ", ".join(
        f"struct({dx} AS dx, {dy} AS dy)"
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)
        if not (dx == 0 and dy == 0)
    )
    scat = cv.selectExpr(
        f"explode(array({offs})) AS o", "cx", "cy", "x"
    ).selectExpr(
        f"((cx + o.dx + {nx}) % {nx}) AS tx", "(cy + o.dy) AS ty",
        "x AS sx",
    ).filter(f"ty >= {cy0} AND ty < {cy1}")
    pair = (
        scat.join(
            cv.selectExpr("cx AS tx", "cy AS ty"), ["tx", "ty"]
        )
        .groupBy("tx", "ty")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("wi"),
            F.sum("sx").cast("bigint").alias("nsum"),
        )
    )
    mm = (
        cv.join(
            pair,
            (cv.cx == pair.tx) & (cv.cy == pair.ty),
            "left",
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.expr(
                "CAST(coalesce(sum(wi), 0) AS BIGINT)"
            ).alias("w"),
            F.expr(
                "CAST(coalesce(sum(4 * wi * wi), 0) AS BIGINT)"
            ).alias("s2"),
            F.expr("CAST(sum(x) AS BIGINT)").alias("m1"),
            F.expr("CAST(sum(x * x) AS BIGINT)").alias("m2"),
            F.expr("CAST(sum(x * x * x) AS BIGINT)").alias("m3"),
            F.expr("CAST(sum(x * x * x * x) AS BIGINT)").alias("m4"),
            F.expr(
                "CAST(coalesce(sum(x * nsum), 0) AS BIGINT)"
            ).alias("psum"),
            F.expr(
                "CAST(coalesce(sum(wi * x), 0) AS BIGINT)"
            ).alias("rsum"),
        )
    )
    return mm.selectExpr(*_fld_out_exprs())


# ------------------------ peaks-over-threshold GPD tail per cell --


def _gpd_out_sql(ret_m: int) -> tuple:
    """Shared projection over (k, n_total, se, see) — the 1e-2-
    quantized excess moments: mean excess m̄ = se/(100k), sample
    variance s² = (see/1e4 − k·m̄²)/(k−1), the GPD method-of-moments
    fit (Hosking & Wallis 1987 eq. 10):

        ξ̂ = (1 − m̄²/s²)/2          σ̂ = m̄·(1 − ξ̂ + m̄²/s²)/2
                                        = m̄·(m̄²/s² + 1)/2

    and the ret_m-observation return level
    x_m = u + σ̂/ξ̂·((m·k/n)^ξ̂ − 1) (power is the libm precedent;
    exact ξ̂ = 0 yields NULL via nullif — the exponential-tail
    boundary, measure-zero). NULL fit for k < 3 or zero variance."""
    k = "CAST(k AS DOUBLE)"
    mbar = f"(CAST(se AS DOUBLE) / (100.0E0 * {k}))"
    s2 = (
        f"((CAST(see AS DOUBLE) / 10000.0E0 - {k} * {mbar} * {mbar}) "
        f"/ ({k} - 1.0E0))"
    )
    ok = f"(k >= 3 AND {s2} > 0.0E0)"
    ratio = f"({mbar} * {mbar} / {s2})"
    xi = f"((1.0E0 - {ratio}) / 2.0E0)"
    sg = f"({mbar} * ({ratio} + 1.0E0) / 2.0E0)"
    lam = f"({ret_m}.0E0 * {k} / CAST(n_total AS DOUBLE))"
    rl = (
        f"(u + {sg} / nullif({xi}, 0.0E0) "
        f"* (power({lam}, {xi}) - 1.0E0))"
    )
    return (
        f"round(CASE WHEN {ok} THEN {mbar} END, 6) AS mean_excess",
        f"round(CASE WHEN {ok} THEN {xi} END, 6) AS gpd_xi",
        f"round(CASE WHEN {ok} THEN {sg} END, 6) AS gpd_sigma",
        f"round(CASE WHEN {ok} THEN {rl} END, 6) AS return_level",
    )


def gpd_tail_cells_sql(
    src_sql: str,
    value: str,
    threshold: float,
    cell_deg: float,
    ret_m: int = 1000,
    lon: str = "lon",
    lat: str = "lat",
) -> str:
    """Per-cell peaks-over-threshold GPD tail fit — the extreme-value
    primitive the ICCLIM battery stops short of (RX5day/R99p count and
    sum exceedances; return LEVELS need a tail model). Pickands-
    Balkema-de Haan: excesses over a high threshold are asymptotically
    GPD; the closed-form method-of-moments fit (Hosking & Wallis 1987)
    keeps the whole estimator inside exact arithmetic + one shared
    double expression — no iterative MLE, no Python.

    Excesses quantize to BIGINT at 1e-2 (the semivariogram quantum) so
    (k, Σe, Σe²) are exact integers; n_total counts ALL in-cell
    observations (the return-level exceedance rate k/n needs it);
    ξ̂ > 0 heavy tail, ξ̂ < 0 bounded tail, ξ̂ = 0 exponential. The
    ret_m-observation return level uses power() (libm precedent).
    NULL fit below 3 exceedances or zero excess variance.

    Output: one row per cell with >= 1 exceedance — (cell_x, cell_y,
    n_total, n_exceed, u, mean_excess, gpd_xi, gpd_sigma,
    return_level), floats round(.,6)."""
    _grid_params(cell_deg)
    u = float(threshold)
    if int(ret_m) < 1:
        raise ValueError(f"ret_m must be >= 1, got {ret_m}")
    _, cx, cy = cell_id_sql(cell_deg, lon, lat)
    qe = (
        f"CAST(round((({value}) - {_pf(u)}) * 100.0E0, 0) AS BIGINT)"
    )
    outs = ", ".join(_gpd_out_sql(int(ret_m)))
    return (
        f"WITH pts AS (SELECT {cx} AS cx, {cy} AS cy, "
        f"(CASE WHEN ({value}) > {_pf(u)} THEN {qe} END) AS e "
        f"FROM ({src_sql}) s WHERE ({value}) IS NOT NULL), "
        f"agg AS (SELECT cx, cy, "
        f"CAST(count(*) AS BIGINT) AS n_total, "
        f"CAST(count(e) AS BIGINT) AS k, "
        f"CAST(coalesce(sum(e), 0) AS BIGINT) AS se, "
        f"CAST(coalesce(sum(e * e), 0) AS BIGINT) AS see "
        f"FROM pts GROUP BY 1, 2) "
        f"SELECT cx AS cell_x, cy AS cell_y, n_total, k AS n_exceed, "
        f"u, {outs} FROM (SELECT *, {_pf(u)} AS u FROM agg) t "
        f"WHERE k >= 1"
    )


def gpd_tail_cells(
    df: DataFrame,
    value: str,
    threshold: float,
    cell_deg: float,
    ret_m: int = 1000,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """POT GPD tail per cell (see :func:`gpd_tail_cells_sql`). Plan:
    ONE corpus hash aggregation carrying both the total count and the
    conditional excess moments — nothing else."""
    _grid_params(cell_deg)
    u = float(threshold)
    if int(ret_m) < 1:
        raise ValueError(f"ret_m must be >= 1, got {ret_m}")
    _, cx, cy = cell_id_sql(cell_deg, lon, lat)
    qe = (
        f"CAST(round((({value}) - {_pf(u)}) * 100.0E0, 0) AS BIGINT)"
    )
    agg = (
        df.filter(F.expr(f"({value}) IS NOT NULL"))
        .selectExpr(
            f"{cx} AS cx", f"{cy} AS cy",
            f"(CASE WHEN ({value}) > {_pf(u)} THEN {qe} END) AS e",
        )
        .groupBy("cx", "cy")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_total"),
            F.count("e").cast("bigint").alias("k"),
            F.expr("CAST(coalesce(sum(e), 0) AS BIGINT)").alias("se"),
            F.expr(
                "CAST(coalesce(sum(e * e), 0) AS BIGINT)"
            ).alias("see"),
        )
        .filter("k >= 1")
    )
    return agg.selectExpr("*", f"{_pf(u)} AS u").selectExpr(
        "cx AS cell_x", "cy AS cell_y", "n_total", "k AS n_exceed",
        "u", *_gpd_out_sql(int(ret_m)),
    )


# ------------------------------------------- cosinor harmonic fit --

# Basis quantum: cos/sin of the compile-time bin phase quantize to
# BIGINT at 1e9 before the x-weighted sums, so per-cell moments are
# order-independent exact integers (the step_direction_stats posture,
# one decade coarser for headroom: |sum| <= n_events * 1e9 keeps a
# cell inside BIGINT up to ~9.2e9 events).
_COS_SCALE = 10**9


def _cosinor_params(n_bins: int, period: int, f_crit: float) -> int:
    P = int(period)
    T = int(n_bins)
    if P < 3:
        raise ValueError(
            f"period must be >= 3 bins (period 2 degenerates the sine "
            f"component), got {period}"
        )
    if T % P != 0:
        raise ValueError(
            f"n_bins={T} must be a whole number of {P}-bin cycles "
            f"(a partial cycle breaks the orthogonal closed form)"
        )
    if T < 4:
        raise ValueError(
            f"n_bins must be >= 4 (the zero-amplitude F test has "
            f"T - 3 residual df), got {n_bins}"
        )
    if not float(f_crit) > 0.0:
        raise ValueError(f"f_crit must be > 0, got {f_crit}")
    return P


def _cosinor_basis_sql(P: int) -> tuple:
    """Quantized (cos, sin) basis integers of a bin column ``b``:
    phase = 2*pi*(b % P)/P, shared verbatim by both dialects."""
    ph = (
        f"(2.0E0 * pi() * CAST(b % {P} AS DOUBLE) "
        f"/ CAST({P} AS DOUBLE))"
    )
    s = f"{_COS_SCALE}.0E0"
    return (
        f"CAST(round(cos({ph}) * {s}, 0) AS BIGINT)",
        f"CAST(round(sin({ph}) * {s}, 0) AS BIGINT)",
    )


def _cosinor_out_sql(T: int, P: int, f_crit: float) -> tuple:
    """Shared closing projection over the per-cell exact moments
    (n_events, sxx, sc, ss) — one source of truth for both dialects.

    Orthogonality over whole cycles (sum cos = sum sin =
    sum cos*sin = 0, sum cos^2 = sum sin^2 = T/2 for P >= 3) turns
    the least-squares fit x_t ~ M + A*cos(w*t - phi) into closed
    form: a = (2/T)*sum(x*cos), b = (2/T)*sum(x*sin), M = n/T (the
    mesor — absent bins enter through the compile-time T), harmonic
    SS = (T/2)(a^2 + b^2), total SS = (T*sxx - n^2)/T exact to one
    division. The zero-amplitude test is the cosinor F(2, T-3)
    (Nelson-Tong-Lee-Halberg 1979) against the caller's
    published-table critical value (the chi2_crit convention); the
    significance predicate is the division-free cross-multiplied
    form ssh*(T-3) >= 2*f_crit*resid, which stays exact when the
    residual SS underflows to ~0 on a perfect fit."""
    s = f"{_COS_SCALE}.0E0"
    scd = f"(CAST(sc AS DOUBLE) / {s})"
    ssd = f"(CAST(ss AS DOUBLE) / {s})"
    td = f"CAST({T} AS DOUBLE)"
    ssh = f"(2.0E0 / {td} * ({scd} * {scd} + {ssd} * {ssd}))"
    sst = (
        f"(CAST({T} * sxx - n_events * n_events AS DOUBLE) / {td})"
    )
    resid = f"({sst} - {ssh})"
    amp = f"(2.0E0 / {td} * sqrt({scd} * {scd} + {ssd} * {ssd}))"
    peak = (
        f"(((atan2(CAST(ss AS DOUBLE), CAST(sc AS DOUBLE)) "
        f"* CAST({P} AS DOUBLE) / (2.0E0 * pi())) % {P}.0E0 "
        f"+ {P}.0E0) % {P}.0E0)"
    )
    fc = _pf(float(f_crit))
    sig = (
        f"({ssh} * CAST({T - 3} AS DOUBLE) "
        f">= 2.0E0 * {fc} * {resid})"
    )
    flat = f"({T} * sxx = n_events * n_events)"
    return (
        f"round(CAST(n_events AS DOUBLE) / {td}, 6) AS mesor",
        f"round({amp}, 6) AS amplitude",
        f"(CASE WHEN sc = 0 AND ss = 0 THEN NULL "
        f"ELSE round({peak}, 6) END) AS peak_bin",
        f"round(CASE WHEN {flat} THEN NULL "
        f"ELSE least({ssh} / ({sst}), 1.0E0) END, 6) AS r2",
        f"round({ssh} * CAST({T - 3} AS DOUBLE) "
        f"/ (2.0E0 * nullif(greatest({resid}, 0.0E0), 0.0E0)), 6) "
        f"AS f_stat",
        f"(CASE WHEN {flat} THEN 'flat' WHEN {sig} THEN 'rhythmic' "
        f"ELSE 'flat' END) AS rhythm",
    )


def cosinor_cells_sql(
    src_sql: str,
    cell_deg: float,
    t0_us: int,
    bin_us: int,
    n_bins: int,
    period: int,
    f_crit: float,
    ts_us: str = "ts_us",
    lon: str = "lon",
    lat: str = "lat",
) -> str:
    """Per-cell cosinor (single-harmonic regression) of the binned
    event-count series — the rhythmometry FIT beside the existing
    tests: rayleigh_test answers "is there a direction", seasonal_chi2
    answers "is the profile non-uniform"; cosinor answers "WHAT is
    the cycle": mesor (rhythm-adjusted mean), amplitude, acrophase
    (peak_bin, in bins of the P-bin cycle), r2, and the classical
    zero-amplitude F(2, T-3) label (Nelson et al. 1979, the standard
    in chronobiology / seasonality-of-disease work).

    Output: one row per cell with >= 1 in-window event: (cell_x,
    cell_y, n_events, mesor, amplitude, peak_bin, r2, f_stat,
    rhythm); floats round(.,6); constant series -> NULL r2/f_stat,
    'flat'; zero quantized amplitude -> NULL peak_bin."""
    _grid_params(cell_deg)
    _mk_params(t0_us, bin_us, n_bins)
    P = _cosinor_params(n_bins, period, f_crit)
    T = int(n_bins)
    _, cx, cy = cell_id_sql(cell_deg, lon, lat)
    binx = _bin_sql(ts_us, t0_us, bin_us)
    qc, qs = _cosinor_basis_sql(P)
    outs = ", ".join(_cosinor_out_sql(T, P, f_crit))
    return (
        f"WITH ev AS (SELECT {cx} AS cx, {cy} AS cy, "
        f"({binx}) AS b FROM ({src_sql}) q "
        f"WHERE ({binx}) >= 0 AND ({binx}) < {T}), "
        f"c AS (SELECT cx, cy, b, CAST(count(*) AS BIGINT) AS x "
        f"FROM ev GROUP BY 1, 2, 3), "
        f"agg AS (SELECT cx, cy, CAST(sum(x) AS BIGINT) AS n_events, "
        f"CAST(sum(x * x) AS BIGINT) AS sxx, "
        f"CAST(sum(x * ({qc})) AS BIGINT) AS sc, "
        f"CAST(sum(x * ({qs})) AS BIGINT) AS ss "
        f"FROM c GROUP BY 1, 2) "
        f"SELECT cx AS cell_x, cy AS cell_y, n_events, {outs} FROM agg"
    )


def cosinor_cells(
    df: DataFrame,
    cell_deg: float,
    t0_us: int,
    bin_us: int,
    n_bins: int,
    period: int,
    f_crit: float,
    ts_us: str = "ts_us",
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Cosinor harmonic fit per cell (see :func:`cosinor_cells_sql`).
    Plan: ONE corpus hash aggregation to (cell, bin) counts, one
    cell-keyed aggregate over <= T rows/cell (both map-side combined)
    — absent bins never materialize (they contribute 0 to every
    moment and the mesor divides by the compile-time T)."""
    _grid_params(cell_deg)
    _mk_params(t0_us, bin_us, n_bins)
    P = _cosinor_params(n_bins, period, f_crit)
    T = int(n_bins)
    _, cx, cy = cell_id_sql(cell_deg, lon, lat)
    binx = _bin_sql(ts_us, t0_us, bin_us)
    qc, qs = _cosinor_basis_sql(P)
    c = (
        df.selectExpr(f"{cx} AS cx", f"{cy} AS cy", f"({binx}) AS b")
        .filter(f"b >= 0 AND b < {T}")
        .groupBy("cx", "cy", "b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    )
    agg = c.groupBy("cx", "cy").agg(
        F.sum("x").cast("bigint").alias("n_events"),
        F.expr("CAST(sum(x * x) AS BIGINT)").alias("sxx"),
        F.expr(f"CAST(sum(x * ({qc})) AS BIGINT)").alias("sc"),
        F.expr(f"CAST(sum(x * ({qs})) AS BIGINT)").alias("ss"),
    )
    return agg.selectExpr(
        "cx AS cell_x", "cy AS cell_y", "n_events",
        *_cosinor_out_sql(T, P, f_crit),
    )


# -------------------------------------- Wilcoxon rank-sum shift --


def _mw_params(split_us: int, z_crit: float) -> None:
    if split_us != int(split_us):
        raise ValueError(f"split_us must be integral micros, got {split_us}")
    if not float(z_crit) > 0.0:
        raise ValueError(f"z_crit must be > 0, got {z_crit}")


def _mw_out_sql(z_crit: float) -> tuple:
    """Shared closing projection over the per-cell exact moments
    (n_before, n_after, u2x = 2*U1, tied = sum(t^3 - t)) — one source
    of truth for both dialects.

    U1 counts (before > after) pairs plus half the ties, so 2*U1 is
    an exact BIGINT; E[2U1] = n1*n2 and Var[2U1] = (n1*n2/3) *
    ((N+1) - tied/(N(N-1))) (the mid-rank tie correction). The
    continuity correction is +-1 in 2U units. All-tied cells have
    u2x = n1*n2 and zero variance -> z NULL, 'stable'; one-sided
    samples (n1 = 0 or n2 = 0) -> NULL z and NULL shift (no test).
    Direction: AFTER values larger => fewer (before > after) pairs
    => z < 0 => 'increase'."""
    n1d, n2d = "CAST(n_before AS DOUBLE)", "CAST(n_after AS DOUBLE)"
    nn = "(n_before + n_after)"
    num = "(u2x - n_before * n_after)"
    adj = (
        f"(CASE WHEN {num} > 0 THEN {num} - 1 "
        f"WHEN {num} < 0 THEN {num} + 1 ELSE 0 END)"
    )
    var = (
        f"({n1d} * {n2d} / 3.0E0 * (CAST({nn} + 1 AS DOUBLE) "
        f"- CAST(tied AS DOUBLE) "
        f"/ (CAST({nn} AS DOUBLE) * CAST({nn} - 1 AS DOUBLE))))"
    )
    z = (
        f"(CASE WHEN n_before >= 1 AND n_after >= 1 AND {var} > 0.0E0 "
        f"THEN CAST({adj} AS DOUBLE) / sqrt({var}) END)"
    )
    zc = _pf(float(z_crit))
    return (
        "round(CAST(u2x AS DOUBLE) / 2.0E0, 6) AS u_stat",
        f"round({z}, 6) AS z",
        f"(CASE WHEN n_before = 0 OR n_after = 0 THEN NULL "
        f"WHEN {z} <= -{zc} THEN 'increase' "
        f"WHEN {z} >= {zc} THEN 'decrease' "
        f"ELSE 'stable' END) AS shift",
    )


def rank_sum_shift_cells_sql(
    src_sql: str,
    cell_deg: float,
    split_us: int,
    z_crit: float = 1.96,
    value: str = "value",
    ts_us: str = "ts_us",
    lon: str = "lon",
    lat: str = "lat",
) -> str:
    """Per-cell Wilcoxon-Mann-Whitney rank-sum test of a VALUE shift
    between the events before and after a caller-given split time —
    the two-sample before/after design (intervention date, sensor
    swap, deploy) beside pettitt's unknown-change-point scan: Pettitt
    asks WHERE the series broke; rank-sum asks whether the
    distribution moved across a KNOWN boundary, on the raw values
    rather than binned counts (Mann-Whitney 1947; Hollander-Wolfe
    ch. 4, the standard nonparametric location test).

    Values quantize to BIGINT at 1e-2 (the gpd_tail posture) so ties
    are engine-identical and every moment is exact: per (cell,
    quantized value) the two conditional counts, one per-cell window
    over the ordered distinct values accumulates the exclusive
    after-count prefix, and 2*U1 = sum n1(v)*(2*cum2_less(v) + n2(v))
    is an exact BIGINT (U1 itself may be half-integral). The mid-rank
    tie term sum(t^3 - t) is exact BIGINT with documented headroom
    (t^3 < 2^63 => up to ~2.09e6 same-valued events per cell; coarser
    quanta need a wider type first). Inference: normal approximation
    with tie correction and +-1/2 continuity (z_crit is the caller's
    published-table value, the chi2_crit convention).

    Output: one row per cell with >= 1 non-NULL-valued event:
    (cell_x, cell_y, n_before, n_after, u_stat, z, shift) with shift
    in {'increase','decrease','stable'} (NULL when one side is
    empty); u_stat exact, z round(.,6)."""
    _grid_params(cell_deg)
    _mw_params(split_us, z_crit)
    _, cx, cy = cell_id_sql(cell_deg, lon, lat)
    outs = ", ".join(_mw_out_sql(z_crit))
    return (
        f"WITH ev AS (SELECT {cx} AS cx, {cy} AS cy, "
        f"CAST(round(({value}) * 100.0E0, 0) AS BIGINT) AS qv, "
        f"(CASE WHEN ({ts_us}) < {int(split_us)} THEN 1 ELSE 0 END) "
        f"AS pre FROM ({src_sql}) s WHERE ({value}) IS NOT NULL), "
        f"c AS (SELECT cx, cy, qv, "
        f"CAST(sum(pre) AS BIGINT) AS n1, "
        f"CAST(sum(1 - pre) AS BIGINT) AS n2 "
        f"FROM ev GROUP BY 1, 2, 3), "
        f"w AS (SELECT cx, cy, qv, n1, n2, "
        f"CAST(coalesce(sum(n2) OVER (PARTITION BY cx, cy ORDER BY qv "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) "
        f"AS BIGINT) AS c2l FROM c), "
        f"agg AS (SELECT cx, cy, "
        f"CAST(sum(n1) AS BIGINT) AS n_before, "
        f"CAST(sum(n2) AS BIGINT) AS n_after, "
        f"CAST(sum(n1 * (2 * c2l + n2)) AS BIGINT) AS u2x, "
        f"CAST(sum((n1 + n2) * (n1 + n2) * (n1 + n2) - (n1 + n2)) "
        f"AS BIGINT) AS tied "
        f"FROM w GROUP BY 1, 2) "
        f"SELECT cx AS cell_x, cy AS cell_y, n_before, n_after, "
        f"{outs} FROM agg"
    )


def rank_sum_shift_cells(
    df: DataFrame,
    cell_deg: float,
    split_us: int,
    z_crit: float = 1.96,
    value: str = "value",
    ts_us: str = "ts_us",
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Wilcoxon rank-sum before/after shift per cell (see
    :func:`rank_sum_shift_cells_sql`). Plan: ONE corpus hash
    aggregation to (cell, quantized value) conditional counts, one
    cell-keyed window over the ordered distinct values (bounded by
    the value-domain cardinality, not the corpus), one cell
    aggregate — 0 Python, everything map-side combined."""
    _grid_params(cell_deg)
    _mw_params(split_us, z_crit)
    _, cx, cy = cell_id_sql(cell_deg, lon, lat)
    c = (
        df.filter(F.expr(f"({value}) IS NOT NULL"))
        .selectExpr(
            f"{cx} AS cx", f"{cy} AS cy",
            f"CAST(round(({value}) * 100.0E0, 0) AS BIGINT) AS qv",
            f"(CASE WHEN ({ts_us}) < {int(split_us)} THEN 1 ELSE 0 END) "
            f"AS pre",
        )
        .groupBy("cx", "cy", "qv")
        .agg(
            F.expr("CAST(sum(pre) AS BIGINT)").alias("n1"),
            F.expr("CAST(sum(1 - pre) AS BIGINT)").alias("n2"),
        )
    )
    w = Window.partitionBy("cx", "cy").orderBy("qv").rowsBetween(
        Window.unboundedPreceding, -1
    )
    wdf = c.withColumn(
        "c2l", F.coalesce(F.sum("n2").over(w), F.lit(0)).cast("bigint")
    )
    agg = wdf.groupBy("cx", "cy").agg(
        F.expr("CAST(sum(n1) AS BIGINT)").alias("n_before"),
        F.expr("CAST(sum(n2) AS BIGINT)").alias("n_after"),
        F.expr("CAST(sum(n1 * (2 * c2l + n2)) AS BIGINT)").alias("u2x"),
        F.expr(
            "CAST(sum((n1 + n2) * (n1 + n2) * (n1 + n2) - (n1 + n2)) "
            "AS BIGINT)"
        ).alias("tied"),
    )
    return agg.selectExpr(
        "cx AS cell_x", "cy AS cell_y", "n_before", "n_after",
        *_mw_out_sql(z_crit),
    )


# ---------------------------------------- spatial Markov (Rey 2001) --


def _smkv_params(split_us: int, k_classes: int) -> int:
    if split_us != int(split_us):
        raise ValueError(f"split_us must be integral micros, got {split_us}")
    k = int(k_classes)
    if not 2 <= k <= 5:
        raise ValueError(
            f"k_classes must be in 2..5 (conditioned transition cells "
            f"need occupancy), got {k_classes}"
        )
    return k


def _smkv_ctes(
    src_sql: str,
    cell_deg: float,
    lat0: float,
    lat1: float,
    split_us: int,
    k: int,
    value: str,
    ts_us: str,
    lon: str,
    lat: str,
) -> str:
    """The shared CTE chain up to the per-cell (lag_class, c_from,
    c_to) triples — one source of truth for both dialects (the Spark
    side wraps it via spark.sql-compatible strings)."""
    nx, _, _ = _grid_params(cell_deg)
    _check_window_nx(nx, 1)
    cy0, cy1 = _lat_band(cell_deg, lat0, lat1)
    _, cx, cy = cell_id_sql(cell_deg, lon, lat)
    s = _FLD_SCALE
    q = (
        f"CAST(floor((2.0E0 * CAST(vs AS DOUBLE) + CAST(nv AS DOUBLE))"
        f" / (2.0E0 * CAST(nv AS DOUBLE))) AS BIGINT)"
    )
    offs = ", ".join(
        f"({dx}, {dy})"
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)
        if not (dx == 0 and dy == 0)
    )
    # tercile-style class from the exact rank: floor(k*(r-1)/n)
    def cls(r, n):
        return (
            f"CAST(floor(CAST({k} * ({r} - 1) AS DOUBLE) "
            f"/ CAST({n} AS DOUBLE)) AS BIGINT)"
        )

    return (
        f"pts AS (SELECT {cx} AS cx, {cy} AS cy, "
        f"CAST(round(({value}) * {s}.0E0, 0) AS BIGINT) AS qv, "
        f"(CASE WHEN ({ts_us}) < {int(split_us)} THEN 0 ELSE 1 END) "
        f"AS per FROM ({src_sql}) src "
        f"WHERE {cy} >= {cy0} AND {cy} < {cy1} "
        f"AND ({value}) IS NOT NULL), "
        f"cells AS (SELECT cx, cy, per, "
        f"CAST(sum(qv) AS BIGINT) AS vs, "
        f"CAST(count(*) AS BIGINT) AS nv FROM pts GROUP BY 1, 2, 3), "
        f"cv AS (SELECT cx, cy, per, {q} AS x FROM cells), "
        f"rk AS (SELECT cx, cy, per, "
        f"CAST(row_number() OVER (PARTITION BY per "
        f"ORDER BY x, cx, cy) AS BIGINT) AS r, "
        f"CAST(count(*) OVER (PARTITION BY per) AS BIGINT) AS np "
        f"FROM cv), "
        f"cl AS (SELECT cx, cy, per, {cls('r', 'np')} AS c FROM rk), "
        f"offs(dx, dy) AS (VALUES {offs}), "
        f"scat AS (SELECT ((c.cx + o.dx + {nx}) % {nx}) AS tx, "
        f"(c.cy + o.dy) AS ty, c.x FROM cv c CROSS JOIN offs o "
        f"WHERE c.per = 0 AND (c.cy + o.dy) >= {cy0} "
        f"AND (c.cy + o.dy) < {cy1}), "
        f"lagv AS (SELECT t.cx, t.cy, "
        f"(CAST(sum(s.x) AS DOUBLE) / CAST(count(*) AS DOUBLE)) AS lx "
        f"FROM scat s JOIN (SELECT cx, cy FROM cv WHERE per = 0) t "
        f"ON s.tx = t.cx AND s.ty = t.cy GROUP BY 1, 2), "
        f"lrk AS (SELECT cx, cy, "
        f"CAST(row_number() OVER (ORDER BY lx, cx, cy) AS BIGINT) AS r, "
        f"CAST(count(*) OVER () AS BIGINT) AS np FROM lagv), "
        f"lcl AS (SELECT cx, cy, {cls('r', 'np')} AS lc FROM lrk), "
        f"tr AS (SELECT f.cx, f.cy, l.lc AS lag_class, "
        f"f.c AS c_from, t.c AS c_to "
        f"FROM (SELECT * FROM cl WHERE per = 0) f "
        f"JOIN (SELECT * FROM cl WHERE per = 1) t "
        f"ON f.cx = t.cx AND f.cy = t.cy "
        f"JOIN lcl l ON f.cx = l.cx AND f.cy = l.cy)"
    )


_SMKV_OUT = (
    "SELECT lag_class, c_from, c_to, "
    "CAST(count(*) AS BIGINT) AS n_cells, "
    "round(CAST(count(*) AS DOUBLE) / CAST(sum(count(*)) OVER "
    "(PARTITION BY lag_class, c_from) AS DOUBLE), 6) AS row_share "
    "FROM tr GROUP BY 1, 2, 3"
)


def spatial_markov_sql(
    src_sql: str,
    cell_deg: float,
    lat0: float,
    lat1: float,
    split_us: int,
    k_classes: int = 3,
    value: str = "value",
    ts_us: str = "ts_us",
    lon: str = "lon",
    lat: str = "lat",
) -> str:
    """Spatial Markov transition matrix (Rey 2001; PySAL giddy's
    ``Spatial_Markov``): do cells move between value classes
    INDEPENDENTLY, or does the neighborhood pull them (a poor cell
    surrounded by rich neighbors upgrades more often)? Per cell
    present in BOTH periods of the split: the before-period class,
    the after-period class, and the class of the spatial LAG (mean of
    the 8 present-neighbor before-means) — rolled up to the
    lag-conditioned transition matrix (<= k^3 rows).

    Exactness: cell values are exact half-up integer means of the
    1e-2-quantized points (focal_value_mean posture); classes come
    from EXACT ranks (row_number over the BIGINT mean with (cx, cy)
    tie-break — a total order) via floor(k·(r−1)/n); the lag mean is
    the engine-identical double ratio of two exact integers (SNHT
    argmax precedent) ranked the same way. Isolated cells (no present
    before-neighbor) carry no lag class and drop, documented.

    Output: (lag_class, c_from, c_to, n_cells, row_share);
    row_share round(.,6) normalizes within (lag_class, c_from)."""
    k = _smkv_params(split_us, k_classes)
    ctes = _smkv_ctes(
        src_sql, cell_deg, lat0, lat1, split_us, k, value, ts_us,
        lon, lat,
    )
    return f"WITH {ctes} {_SMKV_OUT}"


def spatial_markov(
    df: DataFrame,
    cell_deg: float,
    lat0: float,
    lat1: float,
    split_us: int,
    k_classes: int = 3,
    value: str = "value",
    ts_us: str = "ts_us",
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Spatial Markov per-cell class transitions (see
    :func:`spatial_markov_sql` — the SAME CTE chain runs as one
    spark.sql plan over a temp view; every stage is lattice-bounded
    after the first corpus hash aggregation: two period-partitioned
    rank windows, one 8-offset scatter join, one lag rank window,
    two cell-keyed joins, one <= k^3-row rollup)."""
    k = _smkv_params(split_us, k_classes)
    name = "_smkv_src"
    df.createOrReplaceTempView(name)
    ctes = _smkv_ctes(
        f"SELECT * FROM {name}", cell_deg, lat0, lat1, split_us, k,
        value, ts_us, lon, lat,
    )
    return _exec_with_materialized_cte(
        df.sparkSession, f"WITH {ctes} {_SMKV_OUT}", "cells",
        name + "_mat",
    )


# ------------------------------------- field Getis-Ord Gi* (values) --


def _gif_out_sql() -> tuple:
    """Shared closing projection over (cx, cy, x, wi1 = present
    neighbors + self, nsum1 = neighbor+self value sum, n, m1, m2):
    Getis-Ord Gi* z (Ord-Getis 1995 eq. 6/7) — every input an exact
    BIGINT, the z one engine-identical double expression. Cells where
    the denominator degenerates (constant field, or the cell's
    neighborhood covers ALL present cells so n·W = W²) -> NULL z,
    'none'."""
    nd = "CAST(n AS DOUBLE)"
    xb = f"(CAST(m1 AS DOUBLE) / {nd})"
    s2 = f"(CAST(m2 AS DOUBLE) / {nd} - {xb} * {xb})"
    w = "CAST(wi1 AS DOUBLE)"
    num = f"(CAST(nsum1 AS DOUBLE) - {w} * {xb})"
    den = (
        f"sqrt({s2}) * sqrt(nullif(({nd} * {w} - {w} * {w}), 0.0E0) "
        f"/ ({nd} - 1.0E0))"
    )
    z = f"({num} / nullif({den}, 0.0E0))"
    return (
        f"round({z}, 6) AS gi_z",
        f"(CASE WHEN {z} >= 1.96E0 THEN 'hot' "
        f"WHEN {z} <= -1.96E0 THEN 'cold' ELSE 'none' END) AS spot",
    )


def hotspot_gi_field_sql(
    src_sql: str,
    value: str,
    cell_deg: float,
    lat0: float,
    lat1: float,
    lon: str = "lon",
    lat: str = "lat",
) -> str:
    """Getis-Ord Gi* hot/cold spots of a measured FIELD (cell-mean
    value) over PRESENT cells — the station-data form beside the
    count-surface ``hotspot_gi`` (Ord-Getis 1995; where is the field
    locally high relative to the global mean, self included). Weights
    are binary 3x3-incl-self RESTRICTED to present cells, so W_i is
    data-dependent and exact; cell values are the exact half-up
    integer means at 1e-2 (focal_value_mean posture), so m1/m2 and
    every neighborhood sum are exact BIGINTs and z is one shared
    double expression. n < 2 or a constant field -> NULL z.

    Output: one row per present cell (cell_x, cell_y, cell_value,
    n_neighbors, gi_z, spot); cell_value descaled round(.,6)."""
    nx, _, _ = _grid_params(cell_deg)
    _check_window_nx(nx, 1)
    cy0, cy1 = _lat_band(cell_deg, lat0, lat1)
    _, cx, cy = cell_id_sql(cell_deg, lon, lat)
    s = _FLD_SCALE
    q = (
        f"CAST(floor((2.0E0 * CAST(vs AS DOUBLE) + CAST(nv AS DOUBLE))"
        f" / (2.0E0 * CAST(nv AS DOUBLE))) AS BIGINT)"
    )
    offs = ", ".join(
        f"({dx}, {dy})" for dx in (-1, 0, 1) for dy in (-1, 0, 1)
    )
    outs = ", ".join(_gif_out_sql())
    return (
        f"WITH pts AS (SELECT {cx} AS cx, {cy} AS cy, "
        f"CAST(round(({value}) * {s}.0E0, 0) AS BIGINT) AS qv "
        f"FROM ({src_sql}) src "
        f"WHERE {cy} >= {cy0} AND {cy} < {cy1} "
        f"AND ({value}) IS NOT NULL), "
        f"cells AS (SELECT cx, cy, CAST(sum(qv) AS BIGINT) AS vs, "
        f"CAST(count(*) AS BIGINT) AS nv FROM pts GROUP BY 1, 2), "
        f"cv AS (SELECT cx, cy, {q} AS x FROM cells), "
        f"mm AS (SELECT CAST(count(*) AS BIGINT) AS n, "
        f"CAST(sum(x) AS BIGINT) AS m1, "
        f"CAST(sum(x * x) AS BIGINT) AS m2 FROM cv), "
        f"offs(dx, dy) AS (VALUES {offs}), "
        f"scat AS (SELECT ((c.cx + o.dx + {nx}) % {nx}) AS tx, "
        f"(c.cy + o.dy) AS ty, c.x FROM cv c CROSS JOIN offs o "
        f"WHERE (c.cy + o.dy) >= {cy0} AND (c.cy + o.dy) < {cy1}), "
        f"nbr AS (SELECT t.cx, t.cy, t.x, "
        f"CAST(count(*) AS BIGINT) AS wi1, "
        f"CAST(sum(s.x) AS BIGINT) AS nsum1 "
        f"FROM scat s JOIN cv t ON s.tx = t.cx AND s.ty = t.cy "
        f"GROUP BY 1, 2, 3) "
        f"SELECT cx AS cell_x, cy AS cell_y, "
        f"round(CAST(x AS DOUBLE) / {s}.0E0, 6) AS cell_value, "
        f"CAST(wi1 - 1 AS BIGINT) AS n_neighbors, {outs} "
        f"FROM nbr CROSS JOIN mm"
    )


def hotspot_gi_field(
    df: DataFrame,
    value: str,
    cell_deg: float,
    lat0: float,
    lat1: float,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Field Gi* (see :func:`hotspot_gi_field_sql` — the same CTE
    chain runs as one spark.sql plan: 1 corpus hash agg, then
    lattice-bounded scatter + join + a broadcast 1-row moment dim)."""
    name = "_gif_src"
    df.createOrReplaceTempView(name)
    return _exec_with_materialized_cte(
        df.sparkSession, hotspot_gi_field_sql(
            f"SELECT * FROM {name}", value, cell_deg, lat0, lat1,
            lon, lat,
        ), "cells", name + "_mat",
    )


# -------------------------------- bivariate local Moran (cross-LISA) --


def lisa_bivariate_sql(
    src_sql: str,
    value: str,
    cell_deg: float,
    lat0: float,
    lat1: float,
    lon: str = "lon",
    lat: str = "lat",
    signed_zero: bool = False,
) -> str:
    """Bivariate local Moran (Anselin's cross-LISA; GeoDa 'Bivariate
    Local Moran') between the cell's event DENSITY (x = count) and the
    NEIGHBORHOOD's mean measured value (lag of y) over present cells —
    does activity concentrate where the surrounding field is high
    (HH), or in low-value pockets (HL)? The two variables every
    event+value table carries, so the cross-LISA needs no second
    dataset. Same binary-weight normalization as the house univariate
    :func:`local_morans_i`, crossed:

        IB_i = n · (x_i−mx) · Σ_j w_ij (y_j−my)
                 / sqrt(Σ(x−mx)² · Σ(y−my)²)

    over the present-cell graph (morans_i_field convention: weights
    restrict to present cells, W data-dependent). x is the exact
    BIGINT cell count, y the exact half-up integer cell mean at 1e-2
    (focal_value_mean posture); the neighbor term expands exactly
    (nsum_y − w_i·my) so IB_i is ONE shared double expression over
    exact integers. Quadrant = sign(x dev) × sign(y lag dev)
    (HH/LL/HL/LH — the cross-cluster map). Constant x or y surface ->
    NULL IB (den 0); isolated present cells keep w_i = 0 (pure-x
    deviation row, lag 0 — LH/HL by the x sign alone, documented).

    Output: one row per present cell: (cell_x, cell_y, cnt,
    n_neighbors, ib_i, quadrant); ib_i round(.,6)."""
    nx, _, _ = _grid_params(cell_deg)
    _check_window_nx(nx, 1)
    cy0, cy1 = _lat_band(cell_deg, lat0, lat1)
    _, cx, cy = cell_id_sql(cell_deg, lon, lat)
    s = _FLD_SCALE
    q = (
        f"CAST(floor((2.0E0 * CAST(vs AS DOUBLE) + CAST(nv AS DOUBLE))"
        f" / (2.0E0 * CAST(nv AS DOUBLE))) AS BIGINT)"
    )
    offs = ", ".join(
        f"({dx}, {dy})"
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)
        if not (dx == 0 and dy == 0)
    )
    n = "CAST(n AS DOUBLE)"
    mx = f"(CAST(sx AS DOUBLE) / {n})"
    my = f"(CAST(sy AS DOUBLE) / {n})"
    devx = f"(CAST(cnt AS DOUBLE) - {mx})"
    lagy = f"(CAST(nsum_y AS DOUBLE) - CAST(wi AS DOUBLE) * {my})"
    denx = f"(CAST(sxx AS DOUBLE) - {n} * {mx} * {mx})"
    deny = f"(CAST(syy AS DOUBLE) - {n} * {my} * {my})"
    ib = (
        f"({n} * {devx} * {lagy} "
        f"/ nullif(sqrt({denx} * {deny}), 0.0E0))"
    )
    ib_out = f"round({ib}, 6)"
    if signed_zero:
        # SPARK SIDE ONLY (the oracle keeps the bare round, its text is
        # the frozen fingerprint): DuckDB's round preserves the sign of
        # zero — round(-0.0, 6) and round(-1e-9, 6) are both -0.0 —
        # while Spark's normalizes to +0.0 (the r5 driver red: 9 rows
        # differing only in the sign bit of ib_i). The unrounded ib is
        # bit-identical in both engines (one shared double expression
        # over exact BIGINT aggregates), so re-signing Spark's rounded
        # zero from the unrounded value reproduces DuckDB exactly:
        # negative input (or a literal -0.0, detectable only via its
        # string form — Spark's 1/0.0 is NULL under ANSI-off) rounding
        # to zero emits -0.0, everything else keeps round's result.
        ib_out = (
            f"CASE WHEN round({ib}, 6) = 0.0E0 AND ({ib} < 0.0E0 "
            f"OR CAST({ib} AS STRING) = '-0.0') "
            f"THEN CAST('-0.0' AS DOUBLE) ELSE round({ib}, 6) END"
        )
    return (
        f"WITH pts AS (SELECT {cx} AS cx, {cy} AS cy, "
        f"CAST(round(({value}) * {s}.0E0, 0) AS BIGINT) AS qv "
        f"FROM ({src_sql}) src "
        f"WHERE {cy} >= {cy0} AND {cy} < {cy1} "
        f"AND ({value}) IS NOT NULL), "
        f"cells AS (SELECT cx, cy, CAST(count(*) AS BIGINT) AS cnt, "
        f"CAST(sum(qv) AS BIGINT) AS vs, "
        f"CAST(count(*) AS BIGINT) AS nv FROM pts GROUP BY 1, 2), "
        f"cv AS (SELECT cx, cy, cnt, {q} AS y FROM cells), "
        f"mm AS (SELECT CAST(count(*) AS BIGINT) AS n, "
        f"CAST(sum(cnt) AS BIGINT) AS sx, "
        f"CAST(sum(cnt * cnt) AS BIGINT) AS sxx, "
        f"CAST(sum(y) AS BIGINT) AS sy, "
        f"CAST(sum(y * y) AS BIGINT) AS syy FROM cv), "
        f"offs(dx, dy) AS (VALUES {offs}), "
        f"scat AS (SELECT ((c.cx + o.dx + {nx}) % {nx}) AS tx, "
        f"(c.cy + o.dy) AS ty, c.y FROM cv c CROSS JOIN offs o "
        f"WHERE (c.cy + o.dy) >= {cy0} AND (c.cy + o.dy) < {cy1}), "
        f"nbr AS (SELECT t.cx, t.cy, t.cnt, "
        f"CAST(coalesce(count(s.y), 0) AS BIGINT) AS wi, "
        f"CAST(coalesce(sum(s.y), 0) AS BIGINT) AS nsum_y "
        f"FROM cv t LEFT JOIN scat s "
        f"ON s.tx = t.cx AND s.ty = t.cy GROUP BY 1, 2, 3) "
        f"SELECT cx AS cell_x, cy AS cell_y, cnt, "
        f"CAST(wi AS BIGINT) AS n_neighbors, "
        f"{ib_out} AS ib_i, "
        f"(CASE WHEN {devx} >= 0.0E0 AND {lagy} >= 0.0E0 THEN 'HH' "
        f"WHEN {devx} < 0.0E0 AND {lagy} < 0.0E0 THEN 'LL' "
        f"WHEN {devx} >= 0.0E0 THEN 'HL' ELSE 'LH' END) AS quadrant "
        f"FROM nbr CROSS JOIN mm"
    )


def lisa_bivariate(
    df: DataFrame,
    value: str,
    cell_deg: float,
    lat0: float,
    lat1: float,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Bivariate local Moran (see :func:`lisa_bivariate_sql` — the
    same CTE chain as one spark.sql plan: 1 corpus hash agg, then
    lattice-bounded scatter + LEFT join back + broadcast 1-row
    moments)."""
    name = "_lisab_src"
    df.createOrReplaceTempView(name)
    return _exec_with_materialized_cte(
        df.sparkSession, lisa_bivariate_sql(
            f"SELECT * FROM {name}", value, cell_deg, lat0, lat1,
            lon, lat, signed_zero=True,
        ), "cells", name + "_mat",
    )


# --------------------------- EB-standardized Moran (Assunção-Reis) --


def eb_moran_sql(
    src_sql: str,
    cat: str,
    case_value: str,
    cell_deg: float,
    lat0: float,
    lat1: float,
    lon: str = "lon",
    lat: str = "lat",
) -> str:
    """Assunção-Reis (1999) Empirical-Bayes-standardized Moran's I of
    a per-cell case RATE — GeoDa's "Moran's I with EB rates", the
    standard fix for the rate-map trap: raw-rate Moran mistakes
    small-denominator noise for spatial structure, so each cell's
    rate deviation is standardized by its OWN sampling variance
    v_i = â + b̂/t_i (method-of-moments prior: b̂ = X/T overall rate,
    s² the :func:`eb_rates` moment sum, â = s² − b̂·K/T truncated at
    0) and Moran's I runs on z_i = (r_i − b̂)/√v_i over the
    present-cell graph with the FULL house inference tree
    (:func:`_fld_out_exprs` — same Cliff-Ord randomization algebra as
    :func:`morans_i_field`, shared verbatim).

    Exactness posture: per-cell (x_i, t_i) and every weight count are
    exact BIGINTs; the z transform and its moment sums are
    lattice-bounded double sums (the eb_rates vsum / word_entropy
    round-6 posture). Cells with v_i <= 0 (a case-free corpus) carry
    no z and drop. Output: ONE row (n_cells, w_sum, morans_i, e_i,
    var_i, z, pattern)."""
    nx, _, _ = _grid_params(cell_deg)
    _check_window_nx(nx, 1)
    cy0, cy1 = _lat_band(cell_deg, lat0, lat1)
    _, cx, cy = cell_id_sql(cell_deg, lon, lat)
    case = f"(CASE WHEN ({cat}) = {case_value} THEN 1 ELSE 0 END)"
    offs = ", ".join(
        f"({dx}, {dy})"
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)
        if not (dx == 0 and dy == 0)
    )
    tt = "CAST(t AS DOUBLE)"
    b = f"(CAST(x AS DOUBLE) / {tt})"
    a_ = (
        f"greatest(0.0E0, (s2m / {tt} - {b} * CAST(k AS DOUBLE) "
        f"/ {tt}))"
    )
    vi = f"({a_} + {b} / CAST(t_i AS DOUBLE))"
    r = "(CAST(x_i AS DOUBLE) / CAST(t_i AS DOUBLE))"
    outs = ", ".join(_fld_out_exprs())
    return (
        f"WITH c AS (SELECT {cx} AS cx, {cy} AS cy, "
        f"CAST(sum({case}) AS BIGINT) AS x_i, "
        f"CAST(count(*) AS BIGINT) AS t_i "
        f"FROM ({src_sql}) s "
        f"WHERE {cy} >= {cy0} AND {cy} < {cy1} GROUP BY 1, 2), "
        f"tot AS (SELECT CAST(sum(x_i) AS BIGINT) AS x, "
        f"CAST(sum(t_i) AS BIGINT) AS t, "
        f"CAST(count(*) AS BIGINT) AS k FROM c), "
        f"vs AS (SELECT sum(CAST((c.x_i * tot.t - c.t_i * tot.x) "
        f"AS DOUBLE) * CAST((c.x_i * tot.t - c.t_i * tot.x) "
        f"AS DOUBLE) / (CAST(c.t_i AS DOUBLE) "
        f"* CAST(tot.t AS DOUBLE) * CAST(tot.t AS DOUBLE))) AS s2m "
        f"FROM c CROSS JOIN tot), "
        f"zt AS (SELECT cx, cy, ({r} - {b}) / sqrt({vi}) AS z "
        f"FROM c CROSS JOIN tot CROSS JOIN vs WHERE {vi} > 0.0E0), "
        f"offs(dx, dy) AS (VALUES {offs}), "
        f"scat AS (SELECT ((zt.cx + o.dx + {nx}) % {nx}) AS tx, "
        f"(zt.cy + o.dy) AS ty, zt.z FROM zt CROSS JOIN offs o "
        f"WHERE (zt.cy + o.dy) >= {cy0} AND (zt.cy + o.dy) < {cy1}), "
        f"pair AS (SELECT t.cx, t.cy, t.z, "
        f"CAST(count(*) AS BIGINT) AS wi, sum(s.z) AS nsum "
        f"FROM scat s JOIN zt t ON s.tx = t.cx AND s.ty = t.cy "
        f"GROUP BY 1, 2, 3), "
        f"mm AS (SELECT CAST(count(*) AS BIGINT) AS n, "
        f"CAST(coalesce(sum(p.wi), 0) AS BIGINT) AS w, "
        f"CAST(coalesce(sum(4 * p.wi * p.wi), 0) AS BIGINT) AS s2, "
        f"sum(z.z) AS m1, sum(z.z * z.z) AS m2, "
        f"sum(z.z * z.z * z.z) AS m3, "
        f"sum(z.z * z.z * z.z * z.z) AS m4, "
        f"coalesce(sum(p.wi * p.z), 0.0E0) AS rsum, "
        f"coalesce(sum(p.z * p.nsum), 0.0E0) AS psum "
        f"FROM zt z LEFT JOIN pair p ON z.cx = p.cx AND z.cy = p.cy) "
        f"SELECT {outs} FROM mm"
    )


def eb_moran(
    df: DataFrame,
    cat: str,
    case_value: str,
    cell_deg: float,
    lat0: float,
    lat1: float,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """EB-standardized Moran (see :func:`eb_moran_sql` — the same CTE
    chain as one spark.sql plan: one corpus hash agg, then
    lattice-bounded transforms, scatter, and a 1-row inference)."""
    name = "_ebm_src"
    df.createOrReplaceTempView(name)
    return _exec_with_materialized_cte(
        df.sparkSession, eb_moran_sql(
            f"SELECT * FROM {name}", cat, case_value, cell_deg,
            lat0, lat1, lon, lat,
        ), "c", name + "_mat",
    )


# ------------------------------------- seasonal decomposition (MA) --


def _sdec_params(n_bins: int, period: int) -> int:
    P = int(period)
    T = int(n_bins)
    if P < 3 or P % 2 == 0:
        raise ValueError(
            f"period must be odd >= 3 (centered moving average of "
            f"length P; even periods need half-weight ends), got "
            f"{period}"
        )
    if T % P != 0 or T < 2 * P:
        raise ValueError(
            f"n_bins={T} must be >= 2 whole {P}-bin cycles (one cycle "
            f"leaves no complete-window interior)"
        )
    return P


def seasonal_decompose_sql(
    src_sql: str,
    cell_deg: float,
    t0_us: int,
    bin_us: int,
    n_bins: int,
    period: int,
    ts_us: str = "ts_us",
    lon: str = "lon",
    lat: str = "lat",
    signed_zero: bool = False,
) -> str:
    """Classical additive seasonal decomposition of each cell's binned
    count series (Macaulay 1931 ratio-to-moving-average lineage; the
    moving-average core of STL without loess): trend = centered
    P-bin moving average over the ZERO-FILLED cube, seasonal = the
    phase means of the detrended series RE-CENTERED to sum to zero
    over a cycle, residual = the rest. The nonparametric companion to
    :func:`cosinor_cells` (cosinor FITS one harmonic; decomposition
    makes no shape assumption) and the standard pre-step before
    anomaly/change detection on seasonal series.

    Exactness: counts are exact BIGINTs on the pettitt-style
    zero-filled bounded cube; the MA is a P-term window sum of
    integers divided once (engine-identical double); seasonal means
    are double sums over <= T/P interior terms per phase
    (word_entropy round-6 posture); windows and group-bys live in
    separate CTE stages (the DuckDB no-nested-window rule). Trend is
    NULL where the centered window is incomplete (first/last
    (P-1)/2 bins), and seasonal/resid follow.

    Output: one row per (active cell, bin): (cell_x, cell_y, b, x,
    trend, seasonal, resid), floats round(.,6)."""
    _grid_params(cell_deg)
    _mk_params(t0_us, bin_us, n_bins)
    P = _sdec_params(n_bins, period)
    T = int(n_bins)
    h = (P - 1) // 2
    nx, _, _ = _grid_params(cell_deg)
    _, cx, cy = cell_id_sql(cell_deg, lon, lat)
    binx = _bin_sql(ts_us, t0_us, bin_us)
    bvals = ", ".join(f"({b})" for b in range(T))
    pd_ = f"CAST({P} AS DOUBLE)"

    def _r6(expr: str) -> str:
        # SPARK SIDE ONLY (oracle keeps the bare round): DuckDB's round
        # maps a tiny-negative input to -0.0, Spark's to +0.0 — the r5
        # driver red's 2 resid rows. Re-sign Spark's rounded zero from
        # the unrounded value (string form catches a literal -0.0;
        # Spark's 1/0.0 is NULL under ANSI-off). NOTE the oracle itself
        # stays thread-nondeterministic at threads>=8 (raw-double avg;
        # measured a 16/14 coin flip between the -0.0 and +0.0 variants
        # at threads=32) — this makes Spark match the deterministic
        # threads=1 variant, which is also the majority threaded draw.
        if not signed_zero:
            return f"round({expr}, 6)"
        return (
            f"CASE WHEN round({expr}, 6) = 0.0E0 AND (({expr}) < 0.0E0 "
            f"OR CAST(({expr}) AS STRING) = '-0.0') "
            f"THEN CAST('-0.0' AS DOUBLE) ELSE round({expr}, 6) END"
        )

    return (
        f"WITH ev AS (SELECT {cx} AS cx, {cy} AS cy, {binx} AS b "
        f"FROM ({src_sql}) s), "
        f"c AS (SELECT cx, cy, b, CAST(count(*) AS BIGINT) AS x "
        f"FROM ev WHERE b >= 0 AND b < {T} GROUP BY 1, 2, 3), "
        f"act AS (SELECT DISTINCT cx, cy FROM c), "
        f"bins(b) AS (VALUES {bvals}), "
        f"cube0 AS (SELECT act.cx, act.cy, CAST(bins.b AS BIGINT) AS b, "
        f"CAST(coalesce(c.x, 0) AS BIGINT) AS x "
        f"FROM act CROSS JOIN bins "
        f"LEFT JOIN c ON c.cx = act.cx AND c.cy = act.cy "
        f"AND c.b = CAST(bins.b AS BIGINT)), "
        f"tr AS (SELECT cx, cy, b, x, "
        f"(CASE WHEN b >= {h} AND b < {T - h} THEN "
        f"CAST(sum(x) OVER (PARTITION BY cx, cy ORDER BY b "
        f"ROWS BETWEEN {h} PRECEDING AND {h} FOLLOWING) AS DOUBLE) "
        f"/ {pd_} END) AS trend FROM cube0), "
        f"se AS (SELECT cx, cy, (b % {P}) AS ph, "
        f"avg(CAST(x AS DOUBLE) - trend) AS sraw "
        f"FROM tr WHERE trend IS NOT NULL GROUP BY 1, 2, 3), "
        f"sc AS (SELECT cx, cy, ph, "
        f"sraw - avg(sraw) OVER (PARTITION BY cx, cy) AS seas "
        f"FROM se) "
        f"SELECT tr.cx AS cell_x, tr.cy AS cell_y, tr.b, tr.x, "
        f"round(tr.trend, 6) AS trend, "
        f"{_r6('sc.seas')} AS seasonal, "
        f"{_r6('CAST(tr.x AS DOUBLE) - tr.trend - sc.seas')} AS resid "
        f"FROM tr LEFT JOIN sc ON sc.cx = tr.cx AND sc.cy = tr.cy "
        f"AND sc.ph = (tr.b % {P})"
    )


def seasonal_decompose(
    df: DataFrame,
    cell_deg: float,
    t0_us: int,
    bin_us: int,
    n_bins: int,
    period: int,
    ts_us: str = "ts_us",
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Seasonal decomposition (see :func:`seasonal_decompose_sql` —
    the same CTE chain as one spark.sql plan: 1 corpus hash agg, then
    the bounded zero-filled cube, one cell-keyed MA window, one
    phase group-by, one lattice-bounded join back)."""
    name = "_sdec_src"
    df.createOrReplaceTempView(name)
    return _exec_with_materialized_cte(
        df.sparkSession, seasonal_decompose_sql(
            f"SELECT * FROM {name}", cell_deg, t0_us, bin_us, n_bins,
            period, ts_us, lon, lat, signed_zero=True,
        ), "c", name + "_mat",
    )


# --------------------------------- lagged teleconnection map --


def _tele_params(n_bins: int, max_lag: int) -> int:
    L = int(max_lag)
    if not 0 <= L <= 5:
        raise ValueError(
            f"max_lag must be in 0..5 (bounded literal lag fan-out, "
            f"and the series must keep T - lag >= 3 overlap), got "
            f"{max_lag}"
        )
    if int(n_bins) < L + 3:
        raise ValueError(
            f"n_bins={n_bins} leaves < 3 overlapping bins at "
            f"lag {L}"
        )
    return L


def teleconnection_sql(
    src_sql: str,
    cell_deg: float,
    t0_us: int,
    bin_us: int,
    n_bins: int,
    ref_cx: int = None,
    ref_cy: int = None,
    max_lag: int = 2,
    ts_us: str = "ts_us",
    lon: str = "lon",
    lat: str = "lat",
) -> str:
    """Lagged teleconnection map: Pearson correlation of every cell's
    binned count series against a REFERENCE cell's series at lags
    −L..+L — the index-correlation map of climate analysis (regress
    the field on a Niño3.4-style index cell and read which regions
    co-vary, lead, or trail; positive lag = the cell TRAILS the
    reference). Counts on the zero-filled cube keep every moment an
    exact BIGINT; per (cell, lag) the correlation closes as
    (nΣxy − ΣxΣy)/sqrt((nΣx² − (Σx)²)(nΣy² − (Σy)²)) over the
    T−|lag| overlapping bins — one shared double expression over
    integers (the zipf cancellation discipline). Degenerate windows
    (either side constant over the overlap) -> NULL r. best_lag =
    the lag maximizing |r| (earliest on ties via the exact min_by
    key over the ROUNDED r — engine-identical by construction).

    Plan: ONE corpus hash agg -> (cell, bin); the reference series is
    a T-row broadcast; the lag fan-out is a bounded literal; per
    (cell, lag) one aggregation over <= T rows. Output: one row per
    (active cell, lag): (cell_x, cell_y, lag, n_overlap, r) plus
    best_lag/best_r repeated per cell for the map readout."""
    _grid_params(cell_deg)
    _mk_params(t0_us, bin_us, n_bins)
    L = _tele_params(n_bins, max_lag)
    T = int(n_bins)
    nx, _, _ = _grid_params(cell_deg)
    _, cx, cy = cell_id_sql(cell_deg, lon, lat)
    binx = _bin_sql(ts_us, t0_us, bin_us)
    bvals = ", ".join(f"({b})" for b in range(T))
    lvals = ", ".join(f"({k})" for k in range(-L, L + 1))
    if ref_cx is None:
        # deterministic default: the busiest cell (exact total order
        # on (-total, cx, cy)) — active at every SF by construction
        ref_cte = (
            "rsel AS (SELECT cx, cy FROM (SELECT cx, cy, "
            "CAST(sum(x) AS BIGINT) AS tot FROM c GROUP BY 1, 2) t "
            "ORDER BY tot DESC, cx, cy LIMIT 1), "
            "ref AS (SELECT q.b, q.x AS y FROM cube0 q "
            "JOIN rsel ON q.cx = rsel.cx AND q.cy = rsel.cy), "
        )
    else:
        ref_cte = (
            f"ref AS (SELECT b, x AS y FROM cube0 "
            f"WHERE cx = {int(ref_cx)} AND cy = {int(ref_cy)}), "
        )
    n = "CAST(cnt AS DOUBLE)"
    num = (
        f"({n} * CAST(sxy AS DOUBLE) "
        f"- CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    )
    dx = (
        f"({n} * CAST(sxx AS DOUBLE) "
        f"- CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    )
    dy = (
        f"({n} * CAST(syy AS DOUBLE) "
        f"- CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))"
    )
    r = (
        f"(CASE WHEN {dx} > 0.0E0 AND {dy} > 0.0E0 "
        f"THEN round({num} / sqrt({dx} * {dy}), 6) END)"
    )
    # exact argmax key over the ROUNDED r (an exact decimal both
    # engines): max |r|, ties -> earliest lag
    key = (
        f"(CASE WHEN r IS NULL THEN 9.0E9 "
        f"ELSE -abs(r) * 1.0E7 + (lag + {L}) END)"
    )
    return (
        f"WITH ev AS (SELECT {cx} AS cx, {cy} AS cy, {binx} AS b "
        f"FROM ({src_sql}) s), "
        f"c AS (SELECT cx, cy, b, CAST(count(*) AS BIGINT) AS x "
        f"FROM ev WHERE b >= 0 AND b < {T} GROUP BY 1, 2, 3), "
        f"act AS (SELECT DISTINCT cx, cy FROM c), "
        f"bins(b) AS (VALUES {bvals}), "
        f"cube0 AS (SELECT act.cx, act.cy, CAST(bins.b AS BIGINT) AS b, "
        f"CAST(coalesce(c.x, 0) AS BIGINT) AS x "
        f"FROM act CROSS JOIN bins "
        f"LEFT JOIN c ON c.cx = act.cx AND c.cy = act.cy "
        f"AND c.b = CAST(bins.b AS BIGINT)), "
        + ref_cte +
        f"lags(lag) AS (VALUES {lvals}), "
        f"mo AS (SELECT q.cx, q.cy, lags.lag, "
        f"CAST(count(*) AS BIGINT) AS cnt, "
        f"CAST(sum(q.x) AS BIGINT) AS sx, "
        f"CAST(sum(q.x * q.x) AS BIGINT) AS sxx, "
        f"CAST(sum(ref.y) AS BIGINT) AS sy, "
        f"CAST(sum(ref.y * ref.y) AS BIGINT) AS syy, "
        f"CAST(sum(q.x * ref.y) AS BIGINT) AS sxy "
        f"FROM cube0 q CROSS JOIN lags "
        f"JOIN ref ON ref.b = q.b - lags.lag "
        f"GROUP BY 1, 2, 3), "
        f"rr AS (SELECT cx, cy, lag, cnt, {r} AS r FROM mo), "
        f"bb AS (SELECT cx, cy, "
        f"CAST(min_by(lag, {key}) AS BIGINT) AS best_lag, "
        f"min_by(r, {key}) AS best_r "
        f"FROM rr GROUP BY 1, 2) "
        f"SELECT rr.cx AS cell_x, rr.cy AS cell_y, rr.lag, "
        f"rr.cnt AS n_overlap, rr.r, bb.best_lag, bb.best_r "
        f"FROM rr JOIN bb ON rr.cx = bb.cx AND rr.cy = bb.cy"
    )


def teleconnection(
    df: DataFrame,
    cell_deg: float,
    t0_us: int,
    bin_us: int,
    n_bins: int,
    ref_cx: int = None,
    ref_cy: int = None,
    max_lag: int = 2,
    ts_us: str = "ts_us",
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Teleconnection map (see :func:`teleconnection_sql` — one
    spark.sql plan: 1 corpus hash agg, bounded cube, T-row reference
    broadcast, literal lag fan-out, per-(cell,lag) aggregation over
    <= T rows)."""
    name = "_tele_src"
    df.createOrReplaceTempView(name)
    return _exec_with_materialized_cte(
        df.sparkSession, teleconnection_sql(
            f"SELECT * FROM {name}", cell_deg, t0_us, bin_us, n_bins,
            ref_cx, ref_cy, max_lag, ts_us, lon, lat,
        ), "c", name + "_mat",
    )


# ------------------- space-time scan Monte-Carlo p-value (SaTScan) --

def spacetime_scan_p_sql(
    src_sql: str,
    cell_deg: float,
    lat0: float,
    lat1: float,
    t0_us: int,
    bin_us: int,
    n_bins: int,
    w_max: int = 2,
    min_count: int = 3,
    n_reps: int = 199,
    seed: str = "r5",
    mu_split: float = 20.0,
    k_max: int = 50,
    ts_us: str = "ts_us",
    lon: str = "lon",
    lat: str = "lat",
    materialized: bool = False,
    alldat_override: str | None = None,
    head_only: bool = False,
    counts_override: str | None = None,
    prospective: bool = False,
) -> str:
    """Monte-Carlo p-value for the space-time scan's max-LLR cluster
    (the 999-replication inference SaTScan reports; Kulldorff 1997 /
    2005) as ONE bounded plan — the corpus is aggregated ONCE to the
    (cell, bin) table and every replication lives on that table.

    Null model: POISSONIZED (unconditional) draws n_cb ~
    Poisson(mu_cb = S_c T_b / N), the standard Poisson-model Monte
    Carlo; it differs from the exact margin-conditioned permutation
    null by O(1/sqrt(N)) in the statistic's null law (FIDELITY.md). An
    exact permutation would need one corpus shuffle PER replication —
    O(N·R) at 10^12 docs — while this plan is lattice-bounded however
    large the corpus. Each replication recomputes its OWN margins and
    total, so the replicated statistic is the same margin-conditioned
    LLR as the observed one (r = 0 flows through the identical
    pipeline).

    Draws are deterministic hash-uniforms (md5-slice, sketch.py:257 —
    no RNG state): mu < mu_split inverts the exact Poisson CDF against
    a literal ln(k!) table (k <= k_max; truncation mass
    P[Poisson(mu_split) > k_max] ~ 4e-10 at the defaults); larger mu
    uses the Box-Muller normal approximation round(mu + z sqrt(mu)),
    standard at such counts.

    Output: ONE row (n_events, n_reps, max_llr, n_ge, p_value) with
    p = (1 + #{r >= 1: maxLLR_r >= maxLLR_obs}) / (n_reps + 1);
    max_llr round(.,6), the comparison on unrounded doubles.
    ``materialized=True`` adds DuckDB's ``AS MATERIALIZED`` hint on the
    replication table (DuckDB re-inlines every CTE reference — the
    draw pipeline is referenced four times); the Spark string omits it
    (same text otherwise — one source of truth modulo the hint).
    """
    from .sketch import md5_slice_int_sql

    _perm_reps_check(n_reps)
    if not 8 <= k_max <= 120:
        raise ValueError(f"k_max must be in [8, 120], got {k_max}")
    if not 1.0 <= mu_split <= k_max / 2.0:
        raise ValueError(
            f"mu_split must be in [1, k_max/2] so CDF truncation stays "
            f"negligible, got {mu_split}"
        )
    nx, cy0, cy1 = _scan_params(
        cell_deg, lat0, lat1, t0_us, bin_us, n_bins, w_max, min_count,
    )
    _, cx, cy = cell_id_sql(cell_deg, lon, lat)
    b = _bin_sql(ts_us, t0_us, bin_us)
    offs = ", ".join(
        f"({dx}, {dy})" for dx in (-1, 0, 1) for dy in (-1, 0, 1)
    )
    wdt = ", ".join(
        f"({w}, {dt})" for w in range(1, w_max + 1) for dt in range(w)
    )
    kf = ", ".join(
        f"({k}, {_pf(math.lgamma(k + 1))})" for k in range(k_max + 1)
    )
    reps = ", ".join(f"({r})" for r in range(1, n_reps + 1))
    key = (
        f"concat('sp', '{seed}', ':', CAST(m.cx AS STRING), ':', "
        f"CAST(m.cy AS STRING), ':', CAST(m.tb AS STRING), ':', "
        f"CAST(q.r AS STRING))"
    )
    u1 = f"((CAST({md5_slice_int_sql(key, 0)} AS DOUBLE) + 1.0E0) / 4294967296.0E0)"
    u2 = f"((CAST({md5_slice_int_sql(key, 1)} AS DOUBLE) + 1.0E0) / 4294967296.0E0)"
    # the big-mu branch reads the PRECOMPUTED u1/u2 columns of the u CTE
    znorm = (
        "(sqrt(0.0E0 - 2.0E0 * ln(u1)) * cos(2.0E0 * pi() * u2))"
    )
    mat = " MATERIALIZED" if materialized else ""
    wop = "=" if prospective else "<="
    # margin-conditioned LLR of a cylinder within replication r
    e = (
        "(CAST(s_marg AS DOUBLE) * CAST(t_marg AS DOUBLE) "
        "/ CAST(n AS DOUBLE))"
    )
    o = "CAST(obs AS DOUBLE)"
    nn = "CAST(n AS DOUBLE)"
    tail = (
        f"(CASE WHEN obs = n THEN 0.0E0 ELSE "
        f"({nn} - {o}) * ln(({nn} - {o}) / ({nn} - {e})) END)"
    )
    llr = (
        f"(CASE WHEN obs >= {int(min_count)} AND {o} > {e} "
        f"THEN {o} * ln({o} / {e}) + {tail} ELSE 0.0E0 END)"
    )
    counts_body = counts_override or _counts_scan_sql(
        src_sql, cell_deg, cy0, cy1, t0_us, bin_us, n_bins, ts_us,
        lon, lat,
    )
    head = (
        f"counts AS ({counts_body}), "
        f"cell AS (SELECT cx, cy, CAST(sum(cnt) AS BIGINT) AS cell_tot "
        f"FROM counts GROUP BY 1, 2), "
        f"bins AS (SELECT tb, CAST(sum(cnt) AS BIGINT) AS bin_tot "
        f"FROM counts GROUP BY 1), "
        f"tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n0 FROM counts), "
        f"mu AS (SELECT c.cx, c.cy, b.tb, CAST(c.cell_tot AS DOUBLE) "
        f"* CAST(b.bin_tot AS DOUBLE) / CAST(t.n0 AS DOUBLE) AS mu "
        f"FROM cell c CROSS JOIN bins b CROSS JOIN tot t), "
        f"kf(k, lnf) AS (VALUES {kf}), "
        f"reps(r) AS (VALUES {reps}), "
        f"offs(dx, dy) AS (VALUES {offs}), "
        f"wdt(w, dt) AS (VALUES {wdt}), "
        # exact inverse-CDF draw below mu_split: n = #{k : CDF(k) < u}
        f"cdf AS (SELECT cx, cy, tb, k, sum(exp(CAST(k AS DOUBLE) "
        f"* ln(mu) - mu - lnf)) OVER (PARTITION BY cx, cy, tb "
        f"ORDER BY k) AS cdf FROM (SELECT m.cx, m.cy, m.tb, m.mu, "
        f"f.k, f.lnf FROM mu m CROSS JOIN kf f "
        f"WHERE m.mu < {_pf(mu_split)}) mk), "
        f"u AS (SELECT m.cx, m.cy, m.tb, m.mu, q.r, {u1} AS u1, "
        f"{u2} AS u2 FROM mu m CROSS JOIN reps q), "
        f"draws AS{mat} ("
        f"SELECT u.cx, u.cy, u.tb, u.r, CAST(sum(CASE WHEN c.cdf < u.u1 "
        f"THEN 1 ELSE 0 END) AS BIGINT) AS cnt "
        f"FROM (SELECT * FROM u WHERE mu < {_pf(mu_split)}) u "
        f"JOIN cdf c ON u.cx = c.cx AND u.cy = c.cy AND u.tb = c.tb "
        f"GROUP BY 1, 2, 3, 4 "
        f"UNION ALL "
        f"SELECT cx, cy, tb, r, CAST(greatest(0.0E0, round(mu "
        f"+ {znorm} * sqrt(mu), 0)) AS BIGINT) AS cnt "
        f"FROM u WHERE mu >= {_pf(mu_split)}), "
        f"alldat AS{mat} (SELECT cx, cy, tb, 0 AS r, cnt FROM counts "
        f"UNION ALL SELECT cx, cy, tb, r, cnt FROM draws WHERE cnt > 0)"
    )
    if head_only:
        # the draw pipeline alone, for the DataFrame twin to materialize
        return f"WITH {head} SELECT cx, cy, tb, r, cnt FROM alldat"
    if alldat_override is not None:
        # the DataFrame twin materializes the draw pipeline ONCE
        # (localCheckpoint) — the executed string reads that view; the
        # oracle keeps the full self-contained head above
        head = f"alldat AS ({alldat_override})"
    return (
        f"WITH {head}, "
        f"offs2(dx, dy) AS (VALUES {offs}), "
        f"wdt2(w, dt) AS (VALUES {wdt}), "
        f"cyl AS (SELECT a.r, ((a.cx + o.dx + {nx}) % {nx}) AS cx, "
        f"(a.cy + o.dy) AS cy, (a.tb - d.dt) AS ts, d.w, "
        f"CAST(sum(a.cnt) AS BIGINT) AS obs "
        f"FROM alldat a CROSS JOIN offs2 o CROSS JOIN wdt2 d "
        f"WHERE (a.cy + o.dy) >= {cy0} AND (a.cy + o.dy) < {cy1} "
        f"AND (a.tb - d.dt) >= 0 AND (a.tb - d.dt) + d.w {wop} {n_bins} "
        f"GROUP BY 1, 2, 3, 4, 5), "
        f"cellr AS (SELECT r, cx, cy, CAST(sum(cnt) AS BIGINT) "
        f"AS cell_tot FROM alldat GROUP BY 1, 2, 3), "
        f"smargr AS (SELECT l.r, ((l.cx + o.dx + {nx}) % {nx}) AS cx, "
        f"(l.cy + o.dy) AS cy, CAST(sum(l.cell_tot) AS BIGINT) AS s_marg "
        f"FROM cellr l CROSS JOIN offs2 o "
        f"WHERE (l.cy + o.dy) >= {cy0} AND (l.cy + o.dy) < {cy1} "
        f"GROUP BY 1, 2, 3), "
        f"binsr AS (SELECT r, tb, CAST(sum(cnt) AS BIGINT) AS bin_tot "
        f"FROM alldat GROUP BY 1, 2), "
        f"tmargr AS (SELECT b.r, (b.tb - d.dt) AS ts, d.w, "
        f"CAST(sum(b.bin_tot) AS BIGINT) AS t_marg "
        f"FROM binsr b CROSS JOIN wdt2 d "
        f"WHERE (b.tb - d.dt) >= 0 AND (b.tb - d.dt) + d.w {wop} {n_bins} "
        f"GROUP BY 1, 2, 3), "
        f"totr AS (SELECT r, CAST(sum(cnt) AS BIGINT) AS n "
        f"FROM alldat GROUP BY 1), "
        f"mx AS (SELECT y.r, max({llr}) AS max_llr "
        f"FROM cyl y JOIN smargr m ON y.r = m.r AND y.cx = m.cx "
        f"AND y.cy = m.cy "
        f"JOIN tmargr t ON y.r = t.r AND y.ts = t.ts AND y.w = t.w "
        f"JOIN totr g ON y.r = g.r GROUP BY y.r), "
        f"obsx AS (SELECT max_llr AS obs_llr FROM mx WHERE r = 0) "
        f"SELECT t.n0 AS n_events, "
        f"CAST({n_reps} AS BIGINT) AS n_reps, "
        f"round(ox.obs_llr, 6) AS max_llr, "
        f"CAST(coalesce(sum(CASE WHEN m.r > 0 "
        f"AND m.max_llr >= ox.obs_llr THEN 1 ELSE 0 END), 0) AS BIGINT) "
        f"AS n_ge, "
        f"round((1.0E0 + coalesce(sum(CASE WHEN m.r > 0 "
        f"AND m.max_llr >= ox.obs_llr THEN 1 ELSE 0 END), 0)) "
        f"/ {n_reps + 1}.0E0, 6) AS p_value "
        f"FROM mx m CROSS JOIN obsx ox "
        f"CROSS JOIN (SELECT n AS n0 FROM totr WHERE r = 0) t "
        f"GROUP BY t.n0, ox.obs_llr"
    )


def _counts_scan_sql(
    src_sql: str, cell_deg: float, cy0: int, cy1: int,
    t0_us: int, bin_us: int, n_bins: int,
    ts_us: str, lon: str, lat: str,
) -> str:
    """(cx, cy, tb, cnt) over the study band and bin clock — the shared
    corpus-aggregate head of the scan pipelines."""
    _, cx, cy = cell_id_sql(cell_deg, lon, lat)
    b = _bin_sql(ts_us, t0_us, bin_us)
    return (
        f"SELECT {cx} AS cx, {cy} AS cy, {b} AS tb, "
        f"CAST(count(*) AS BIGINT) AS cnt FROM ({src_sql}) s "
        f"WHERE {cy} >= {cy0} AND {cy} < {cy1} "
        f"AND {b} >= 0 AND {b} < {n_bins} GROUP BY 1, 2, 3"
    )


def spacetime_scan_p(
    df: DataFrame,
    cell_deg: float,
    lat0: float,
    lat1: float,
    t0_us: int,
    bin_us: int,
    n_bins: int,
    w_max: int = 2,
    min_count: int = 3,
    n_reps: int = 199,
    seed: str = "r5",
    ts_us: str = "ts_us",
    lon: str = "lon",
    lat: str = "lat",
    view: str = "_stscan_p_src",
    prospective: bool = False,
) -> DataFrame:
    """DataFrame twin of :func:`spacetime_scan_p_sql` — the same
    dialect-neutral string through Catalyst (shared-CTE oracle; the
    second-tier truth is the planted-cluster / CSR battery in
    tests/test_gridstats.py), with ONE deviation for the 100-TB plan
    shape: Spark inlines every CTE reference (the scan tail reads
    ``alldat`` four times, which re-ran the whole corpus-agg + draw
    pipeline each time — 47 corpus scans in the executed plan), so the
    draw table is localCheckpoint-materialized ONCE and the executed
    tail reads that view. The oracle keeps the full self-contained
    string (DuckDB gets the AS MATERIALIZED hint instead)."""
    df.createOrReplaceTempView(view)
    args = dict(
        w_max=w_max, min_count=min_count, n_reps=n_reps, seed=seed,
        ts_us=ts_us, lon=lon, lat=lat, prospective=prospective,
    )
    alldat = df.sparkSession.sql(spacetime_scan_p_sql(
        f"SELECT * FROM {view}", cell_deg, lat0, lat1, t0_us, bin_us,
        n_bins, head_only=True, **args,
    )).localCheckpoint()
    alldat.createOrReplaceTempView(view + "_alldat")
    return df.sparkSession.sql(spacetime_scan_p_sql(
        f"SELECT * FROM {view}", cell_deg, lat0, lat1, t0_us, bin_us,
        n_bins,
        alldat_override=f"SELECT cx, cy, tb, r, cnt FROM {view}_alldat",
        **args,
    ))


def spacetime_scan_top_sql(
    src_sql: str,
    cell_deg: float,
    lat0: float,
    lat1: float,
    t0_us: int,
    bin_us: int,
    n_bins: int,
    w_max: int = 2,
    min_count: int = 3,
    n_reps: int = 199,
    k: int = 3,
    seed: str = "r5",
    ts_us: str = "ts_us",
    lon: str = "lon",
    lat: str = "lat",
    materialized: bool = False,
    counts_override: str | None = None,
    alldat_override: str | None = None,
) -> str:
    """SaTScan's primary + secondary cluster report: the top-``k``
    NON-OVERLAPPING cylinders by LLR, each with its Monte-Carlo p-value
    against the max-LLR null distribution (the standard secondary-
    cluster inference — Kulldorff 1997 §secondary clusters: every
    cluster's LLR is compared to the SAME null max-LLR law the primary
    uses, so secondary p-values are conservative by construction).

    Greedy selection is unrolled as ``k`` literal CTE stages (k is
    small and fixed): stage j picks the max-LLR cylinder (llr DESC,
    then cx/cy/ts/w — a total order, deterministic in both dialects)
    among cylinders overlapping NONE of stages < j. Two cylinders
    overlap when their 3x3 bases share a cell (wrapped |dcx| <= 2 and
    |dcy| <= 2) AND their bin windows intersect. Null replications
    reuse the :func:`spacetime_scan_p_sql` Poissonized machinery
    verbatim (same seed => same draws).

    Output: ``k`` rows (rank, cx, cy, t_start, w_bins, obs, expected,
    llr, n_ge, p_value), fewer if the observed data has fewer
    qualifying non-overlapping cylinders; floats round(.,6).
    """
    if not 1 <= k <= 10:
        raise ValueError(f"k must be in [1, 10] (literal unroll), got {k}")
    nx, cy0, cy1 = _scan_params(
        cell_deg, lat0, lat1, t0_us, bin_us, n_bins, w_max, min_count,
    )
    base = spacetime_scan_p_sql(
        src_sql, cell_deg, lat0, lat1, t0_us, bin_us, n_bins,
        w_max=w_max, min_count=min_count, n_reps=n_reps, seed=seed,
        ts_us=ts_us, lon=lon, lat=lat, materialized=materialized,
        counts_override=counts_override, alldat_override=alldat_override,
    )
    # reuse everything up to (and including) the mx CTE of the p
    # pipeline, then graft the observed-cylinder ranking + greedy
    # selection on top. The final SELECT of the base string is dropped.
    cut = base.rindex(", obsx AS ")
    prefix = base[:cut]
    e = (
        "(CAST(c.s_marg AS DOUBLE) * CAST(c.t_marg AS DOUBLE) "
        "/ CAST(c.n AS DOUBLE))"
    )
    o = "CAST(c.obs AS DOUBLE)"
    nn = "CAST(c.n AS DOUBLE)"
    tail = (
        f"(CASE WHEN c.obs = c.n THEN 0.0E0 ELSE "
        f"({nn} - {o}) * ln(({nn} - {o}) / ({nn} - {e})) END)"
    )
    llr = f"({o} * ln({o} / {e}) + {tail})"
    order = "ORDER BY y.llr DESC, y.cx, y.cy, y.ts, y.w LIMIT 1"

    def no_overlap(prev: str) -> str:
        # wrapped |dcx| <= 2 OR |dcy| <= 2 fails -> disjoint bases;
        # bin windows [ts, ts+w) must also intersect to overlap
        return (
            f"NOT (least((y.cx - {prev}.cx + {nx}) % {nx}, "
            f"({prev}.cx - y.cx + {nx}) % {nx}) <= 2 "
            f"AND abs(y.cy - {prev}.cy) <= 2 "
            f"AND y.ts < {prev}.ts + {prev}.w "
            f"AND {prev}.ts < y.ts + y.w)"
        )

    stages = [
        f"cobs AS (SELECT c.r, c.cx, c.cy, c.ts, c.w, c.obs, "
        f"{e} AS expected, {llr} AS llr FROM ("
        f"SELECT y.*, m.s_marg, t.t_marg, g.n FROM cyl y "
        f"JOIN smargr m ON y.r = m.r AND y.cx = m.cx AND y.cy = m.cy "
        f"JOIN tmargr t ON y.r = t.r AND y.ts = t.ts AND y.w = t.w "
        f"JOIN totr g ON y.r = g.r WHERE y.r = 0 "
        f"AND y.obs >= {int(min_count)}) c "
        f"WHERE {o} > {e})",
        "c0 AS (SELECT y.* FROM cobs y " + order + ")",
    ]
    for j in range(1, k):
        conds = " AND ".join(no_overlap(f"c{i}") for i in range(j))
        crosses = " ".join(f"CROSS JOIN c{i}" for i in range(j))
        stages.append(
            f"c{j} AS (SELECT y.* FROM cobs y {crosses} "
            f"WHERE {conds} {order})"
        )
    sel = " UNION ALL ".join(
        f"SELECT {j + 1} AS rnk, cx, cy, ts, w, obs, expected, llr "
        f"FROM c{j}"
        for j in range(k)
    )
    return (
        prefix + ", "
        + ", ".join(stages)
        + f", sel AS ({sel}) "
        f"SELECT s.rnk AS rank_no, s.cx, s.cy, s.ts AS t_start, s.w AS w_bins, "
        f"s.obs, round(s.expected, 6) AS expected, "
        f"round(s.llr, 6) AS llr, "
        f"CAST(coalesce(sum(CASE WHEN m.r > 0 AND m.max_llr >= s.llr "
        f"THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_ge, "
        f"round((1.0E0 + coalesce(sum(CASE WHEN m.r > 0 "
        f"AND m.max_llr >= s.llr THEN 1 ELSE 0 END), 0)) "
        f"/ {n_reps + 1}.0E0, 6) AS p_value "
        f"FROM sel s CROSS JOIN mx m "
        f"GROUP BY s.rnk, s.cx, s.cy, s.ts, s.w, s.obs, s.expected, "
        f"s.llr"
    )


def spacetime_scan_top(
    df: DataFrame,
    cell_deg: float,
    lat0: float,
    lat1: float,
    t0_us: int,
    bin_us: int,
    n_bins: int,
    w_max: int = 2,
    min_count: int = 3,
    n_reps: int = 199,
    k: int = 3,
    seed: str = "r5",
    ts_us: str = "ts_us",
    lon: str = "lon",
    lat: str = "lat",
    view: str = "_stscan_top_src",
) -> DataFrame:
    """DataFrame twin of :func:`spacetime_scan_top_sql` — the draw
    pipeline localCheckpoint-materialized once (see
    :func:`spacetime_scan_p`); second-tier truth: primary row ==
    spacetime_scan_p, non-overlap invariants, planted two-cluster
    recovery (tests/test_gridstats.py)."""
    df.createOrReplaceTempView(view)
    args = dict(
        w_max=w_max, min_count=min_count, n_reps=n_reps, seed=seed,
        ts_us=ts_us, lon=lon, lat=lat,
    )
    alldat = df.sparkSession.sql(spacetime_scan_p_sql(
        f"SELECT * FROM {view}", cell_deg, lat0, lat1, t0_us, bin_us,
        n_bins, head_only=True, **args,
    )).localCheckpoint()
    alldat.createOrReplaceTempView(view + "_alldat")
    return df.sparkSession.sql(spacetime_scan_top_sql(
        f"SELECT * FROM {view}", cell_deg, lat0, lat1, t0_us, bin_us,
        n_bins, k=k,
        alldat_override=f"SELECT cx, cy, tb, r, cnt FROM {view}_alldat",
        **args,
    ))


def lisa_p_fdr_sql(
    src_sql: str,
    cell_deg: float,
    lat0: float,
    lat1: float,
    n_reps: int = 199,
    q: float = 0.05,
    seed: str = "r5",
    lon: str = "lon",
    lat: str = "lat",
    counts_override: str | None = None,
) -> str:
    """LISA significance map with Benjamini-Hochberg FDR correction
    over the permutation pseudo p-values — the multiple-testing
    discipline GeoDa recommends for cluster maps (its docs' FDR
    cutoff) and the per-cell twin of :func:`hotspot_fdr`'s Gi*
    treatment: raw 5% cutoffs over thousands of lattice cells
    guarantee ~0.05·m false clusters.

    BH step-up over :func:`local_morans_i_p_sql`'s cells: rank by
    p_sim ascending (|lisa_i| descending, then cell as deterministic
    tiebreaks — pseudo-p is discrete, ties abound), reject ranks up to
    the largest i with p_(i) <= i·q/m. All ranked quantities are
    round-6 rationals identical in both engines. Output: the lisa_p
    columns + (p_rank, m_tests, label) with label = the LISA quadrant
    for FDR-significant cells, else 'not significant'.
    """
    if not 0.0 < q < 1.0:
        raise ValueError(f"q must be in (0, 1), got {q}")
    lp = local_morans_i_p_sql(
        src_sql, cell_deg, lat0, lat1, n_reps=n_reps, seed=seed,
        lon=lon, lat=lat, counts_override=counts_override,
    )
    order = "ORDER BY p_sim ASC, abs(lisa_i) DESC, cell_x, cell_y"
    return (
        f"WITH lp AS ({lp}), "
        f"ranked AS (SELECT cell_x, cell_y, cnt, nbr_sum, lisa_i, "
        f"quadrant, p_sim, "
        f"CAST(row_number() OVER ({order}) AS BIGINT) AS p_rank, "
        f"CAST(count(*) OVER () AS BIGINT) AS m_tests FROM lp), "
        f"stepped AS (SELECT *, "
        f"CAST(max(CASE WHEN p_sim <= CAST(p_rank AS DOUBLE) "
        f"* {_pf(q)} / CAST(m_tests AS DOUBLE) "
        f"THEN p_rank ELSE 0 END) OVER () AS BIGINT) AS i_max "
        f"FROM ranked) "
        f"SELECT cell_x, cell_y, cnt, nbr_sum, lisa_i, quadrant, "
        f"p_sim, p_rank, m_tests, "
        f"(CASE WHEN p_rank <= i_max THEN quadrant "
        f"ELSE 'not significant' END) AS label FROM stepped"
    )


def lisa_p_fdr(
    df: DataFrame,
    cell_deg: float,
    lat0: float,
    lat1: float,
    n_reps: int = 199,
    q: float = 0.05,
    seed: str = "r5",
    lon: str = "lon",
    lat: str = "lat",
    view: str = "_lisa_fdr_src",
) -> DataFrame:
    """DataFrame twin of :func:`lisa_p_fdr_sql` (counts materialized
    once, as in :func:`local_morans_i_p`)."""
    df.createOrReplaceTempView(view)
    _, cy0, cy1, _, _ = _moran_lattice(cell_deg, lat0, lat1)
    counts = df.sparkSession.sql(_counts_sql(
        f"SELECT * FROM {view}", cell_deg, cy0, cy1, lon, lat,
    )).localCheckpoint()
    counts.createOrReplaceTempView(view + "_counts")
    # (permocc here sits inside the nested `lp AS (WITH ...)` block, out
    # of _exec_with_materialized_cte's top-level-CTE reach — left as-is;
    # the entry is lattice-bounded and not on the bench path.)
    return df.sparkSession.sql(lisa_p_fdr_sql(
        f"SELECT * FROM {view}", cell_deg, lat0, lat1,
        n_reps=n_reps, q=q, seed=seed, lon=lon, lat=lat,
        counts_override=f"SELECT cx, cy, cnt FROM {view}_counts",
    ))


# ------------------------- purely temporal scan (burst detection) --

def temporal_scan_p_sql(
    src_sql: str,
    t0_us: int,
    bin_us: int,
    n_bins: int,
    w_max: int = 4,
    min_count: int = 3,
    n_reps: int = 199,
    seed: str = "r5",
    mu_split: float = 20.0,
    k_max: int = 50,
    prospective: bool = False,
    ts_us: str = "ts_us",
    counts_override: str | None = None,
) -> str:
    """Purely TEMPORAL scan statistic with Monte-Carlo p (Kulldorff's
    1-D scan — the burst detector): the space-time permutation scan
    conditions on the time marginal, so a corpus-wide burst scores
    ZERO there by design; this operator is its complement, asking "did
    overall volume burst in some window of consecutive bins?" — the
    crawl/ingest anomaly alarm of a training-data pipeline.

    Window score: Poisson GLR of the observed window count against the
    uniform-rate expectation E = N·w/n_bins (the standard discrete-
    time-scan null; a covariate baseline belongs upstream as a
    per-bin weight). Monte Carlo: the same deterministic md5-slice
    Poissonized machinery as :func:`spacetime_scan_p_sql` (exact
    inverse-CDF below mu_split against the literal ln k! table,
    Box-Muller above), drawing n_b ~ Poisson(N/n_bins) per (bin, r)
    and re-conditioning each replication on its OWN total N_r.
    ``prospective=True`` scores only windows ending at the latest bin
    (surveillance mode). Everything after the ONE corpus aggregation
    is n_bins x n_reps bounded — microscopic.

    Output: ONE row (n_events, n_reps, t_start, w_bins, obs, expected,
    llr, n_ge, p_value) for the max-LLR window (llr DESC, ts, w total
    order); p = (1 + #{r: maxLLR_r >= maxLLR_obs})/(n_reps+1).
    """
    from .sketch import md5_slice_int_sql

    _perm_reps_check(n_reps)
    _mk_params(t0_us, bin_us, n_bins)
    if not 1 <= w_max <= n_bins:
        raise ValueError(f"w_max must be in [1, n_bins], got {w_max}")
    if not 8 <= k_max <= 120:
        raise ValueError(f"k_max must be in [8, 120], got {k_max}")
    if not 1.0 <= mu_split <= k_max / 2.0:
        raise ValueError(
            f"mu_split must be in [1, k_max/2], got {mu_split}"
        )
    b = _bin_sql(ts_us, t0_us, bin_us)
    counts_body = counts_override or (
        f"SELECT {b} AS tb, CAST(count(*) AS BIGINT) AS cnt "
        f"FROM ({src_sql}) s WHERE {b} >= 0 AND {b} < {n_bins} "
        f"GROUP BY 1"
    )
    wdt = ", ".join(
        f"({w}, {dt})" for w in range(1, w_max + 1) for dt in range(w)
    )
    kf = ", ".join(
        f"({k}, {_pf(math.lgamma(k + 1))})" for k in range(k_max + 1)
    )
    reps = ", ".join(f"({r})" for r in range(1, n_reps + 1))
    wop = "=" if prospective else "<="
    key = (
        f"concat('tsc', '{seed}', ':', CAST(m.tb AS STRING), ':', "
        f"CAST(q.r AS STRING))"
    )
    u1 = (
        f"((CAST({md5_slice_int_sql(key, 0)} AS DOUBLE) + 1.0E0) "
        f"/ 4294967296.0E0)"
    )
    u2 = (
        f"((CAST({md5_slice_int_sql(key, 1)} AS DOUBLE) + 1.0E0) "
        f"/ 4294967296.0E0)"
    )
    znorm = "(sqrt(0.0E0 - 2.0E0 * ln(u1)) * cos(2.0E0 * pi() * u2))"
    e = (
        f"(CAST(n AS DOUBLE) * CAST(w AS DOUBLE) / {n_bins}.0E0)"
    )
    o = "CAST(obs AS DOUBLE)"
    nn = "CAST(n AS DOUBLE)"
    tail = (
        f"(CASE WHEN obs = n THEN 0.0E0 ELSE "
        f"({nn} - {o}) * ln(({nn} - {o}) / ({nn} - {e})) END)"
    )
    llr = (
        f"(CASE WHEN obs >= {int(min_count)} AND {o} > {e} "
        f"THEN {o} * ln({o} / {e}) + {tail} ELSE 0.0E0 END)"
    )
    return (
        f"WITH counts AS ({counts_body}), "
        f"tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n0 FROM counts), "
        # the uniform-rate null intensity covers ALL n_bins bins,
        # including empty ones — generate the bin axis from wdt's
        # dt=0 rows is wrong (w_max-bounded); use a literal bin table
        f"binax(tb) AS (VALUES "
        + ", ".join(f"({i})" for i in range(n_bins))
        + "), "
        f"mu AS (SELECT x.tb, CAST(t.n0 AS DOUBLE) / {n_bins}.0E0 "
        f"AS mu FROM binax x CROSS JOIN tot t), "
        f"kf(k, lnf) AS (VALUES {kf}), "
        f"reps(r) AS (VALUES {reps}), "
        f"wdt(w, dt) AS (VALUES {wdt}), "
        f"cdf AS (SELECT tb, k, sum(exp(CAST(k AS DOUBLE) * ln(mu) "
        f"- mu - lnf)) OVER (PARTITION BY tb ORDER BY k) AS cdf "
        f"FROM (SELECT m.tb, m.mu, f.k, f.lnf FROM mu m CROSS JOIN "
        f"kf f WHERE m.mu < {_pf(mu_split)}) mk), "
        f"u AS (SELECT m.tb, m.mu, q.r, {u1} AS u1, {u2} AS u2 "
        f"FROM mu m CROSS JOIN reps q), "
        f"draws AS (SELECT u.tb, u.r, CAST(sum(CASE WHEN c.cdf < u.u1 "
        f"THEN 1 ELSE 0 END) AS BIGINT) AS cnt "
        f"FROM (SELECT * FROM u WHERE mu < {_pf(mu_split)}) u "
        f"JOIN cdf c ON u.tb = c.tb GROUP BY 1, 2 "
        f"UNION ALL "
        f"SELECT tb, r, CAST(greatest(0.0E0, round(mu + {znorm} "
        f"* sqrt(mu), 0)) AS BIGINT) AS cnt "
        f"FROM u WHERE mu >= {_pf(mu_split)}), "
        f"alldat AS (SELECT tb, 0 AS r, cnt FROM counts "
        f"UNION ALL SELECT tb, r, cnt FROM draws WHERE cnt > 0), "
        f"win AS (SELECT a.r, (a.tb - d.dt) AS ts, d.w, "
        f"CAST(sum(a.cnt) AS BIGINT) AS obs "
        f"FROM alldat a CROSS JOIN wdt d "
        f"WHERE (a.tb - d.dt) >= 0 AND (a.tb - d.dt) + d.w {wop} "
        f"{n_bins} GROUP BY 1, 2, 3), "
        f"totr AS (SELECT r, CAST(sum(cnt) AS BIGINT) AS n "
        f"FROM alldat GROUP BY 1), "
        f"scored AS (SELECT y.r, y.ts, y.w, y.obs, g.n, {llr} AS llr "
        f"FROM win y JOIN totr g ON y.r = g.r), "
        f"mx AS (SELECT r, max(llr) AS max_llr FROM scored GROUP BY r), "
        f"best AS (SELECT s.ts, s.w, s.obs, s.n, s.llr FROM scored s "
        f"WHERE s.r = 0 ORDER BY s.llr DESC, s.ts, s.w LIMIT 1) "
        f"SELECT (SELECT n0 FROM tot) AS n_events, "
        f"CAST({n_reps} AS BIGINT) AS n_reps, "
        f"b.ts AS t_start, b.w AS w_bins, b.obs, "
        f"round(CAST(b.n AS DOUBLE) * CAST(b.w AS DOUBLE) "
        f"/ {n_bins}.0E0, 6) AS expected, "
        f"round(b.llr, 6) AS llr, "
        f"CAST(coalesce(sum(CASE WHEN m.r > 0 AND m.max_llr >= b.llr "
        f"THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_ge, "
        f"round((1.0E0 + coalesce(sum(CASE WHEN m.r > 0 "
        f"AND m.max_llr >= b.llr THEN 1 ELSE 0 END), 0)) "
        f"/ {n_reps + 1}.0E0, 6) AS p_value "
        f"FROM best b CROSS JOIN mx m "
        f"GROUP BY b.ts, b.w, b.obs, b.n, b.llr"
    )


def temporal_scan_p(
    df: DataFrame,
    t0_us: int,
    bin_us: int,
    n_bins: int,
    w_max: int = 4,
    min_count: int = 3,
    n_reps: int = 199,
    seed: str = "r5",
    prospective: bool = False,
    ts_us: str = "ts_us",
    view: str = "_tscan_p_src",
) -> DataFrame:
    """DataFrame twin of :func:`temporal_scan_p_sql` — the bin-count
    aggregate is localCheckpoint-materialized once (n_bins rows);
    second-tier truth: planted-burst / uniform battery in
    tests/test_gridstats.py."""
    df.createOrReplaceTempView(view)
    b = _bin_sql(ts_us, t0_us, bin_us)
    counts = df.sparkSession.sql(
        f"SELECT {b} AS tb, CAST(count(*) AS BIGINT) AS cnt "
        f"FROM (SELECT * FROM {view}) s "
        f"WHERE {b} >= 0 AND {b} < {n_bins} GROUP BY 1"
    ).localCheckpoint()
    counts.createOrReplaceTempView(view + "_counts")
    return df.sparkSession.sql(temporal_scan_p_sql(
        f"SELECT * FROM {view}", t0_us, bin_us, n_bins, w_max=w_max,
        min_count=min_count, n_reps=n_reps, seed=seed,
        prospective=prospective, ts_us=ts_us,
        counts_override=f"SELECT tb, cnt FROM {view}_counts",
    ))
