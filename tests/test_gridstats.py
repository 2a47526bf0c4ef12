"""gridstats: Gi* NumPy truth (zero-filled lattice, wrapped window,
lat-edge W), fixed-point KDE truth, parameter validation, plan audits."""

import math

import numpy as np
import pytest

from ocgis_spark.operators import gridstats as GS

# tiny lattice: 30-degree cells, lat band [-60, 60) -> nx=12, ny=4, n=48
CELL = 30.0
LAT0, LAT1 = -60.0, 60.0
NX, NY = 12, 4
CY0 = -2


def _mk_events(spark, cells):
    """One event per unit of count at the given (cx, cy, cnt) cells
    (cell centers, so snapping is unambiguous)."""
    rows = []
    eid = 0
    for cx, cy, cnt in cells:
        lon = cx * CELL + CELL / 2.0  # cell_id_sql floors lon/CELL mod nx
        lat = cy * CELL + CELL / 2.0
        for _ in range(cnt):
            rows.append((eid, lon, lat))
            eid += 1
    return spark.createDataFrame(
        rows, "event_id bigint, lon double, lat double"
    )


def _numpy_gi(cells):
    """Zero-filled lattice Gi* truth: x[cx, cy-CY0], window wraps in cx,
    clips in cy."""
    x = np.zeros((NX, NY), dtype=np.int64)
    for cx, cy, cnt in cells:
        x[cx % NX, cy - CY0] += cnt
    n = NX * NY
    xbar = x.sum() / n
    s = math.sqrt((x.astype(np.float64) ** 2).sum() / n - xbar * xbar)
    out = {}
    for cx in range(NX):
        for iy in range(NY):
            wsum, w = 0, 0
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    jy = iy + dy
                    if 0 <= jy < NY:
                        w += 1
                        wsum += x[(cx + dx) % NX, jy]
            z = (wsum - xbar * w) / (s * math.sqrt((n * w - w * w) / (n - 1.0)))
            out[(cx, iy + CY0)] = (wsum, w, round(z, 6))
    return out


def test_gi_numpy_truth_wrap_and_edges(spark):
    # a hotspot straddling the antimeridian (cx 11 and cx 0 adjacent)
    # plus a lat-edge cell (cy = -2 -> W = 6) and an interior loner
    cells = [(11, 0, 40), (0, 0, 30), (5, 1, 7), (3, -2, 12)]
    truth = _numpy_gi(cells)
    out = GS.getis_ord_gi(_mk_events(spark, cells), CELL, LAT0, LAT1)
    got = {(r.cell_x, r.cell_y): (r.nbr_sum, r.w_size, r.gi_z)
           for r in out.collect()}
    # every returned cell matches truth exactly
    for key, (nbr, w, z) in got.items():
        tn, tw, tz = truth[key]
        assert (nbr, w) == (tn, tw), key
        assert z == pytest.approx(tz, abs=2e-6), key
    # the seam pair sees each other: cell (0,0) window includes (11,0)
    assert got[(0, 0)][0] == 70
    assert got[(11, 0)][0] == 70
    # lat edge: W = 6 at cy = -2 (no row below the band)
    assert got[(3, -2)][1] == 6
    # cells with an all-empty window are absent (documented contract)
    assert (7, 1) not in got
    # a genuinely hot window has a clearly positive z
    assert got[(0, 0)][2] > 2.0


def test_gi_validation():
    with pytest.raises(ValueError, match="multiple of cell_deg"):
        GS.getis_ord_gi_sql("SELECT 1", 30.0, -50.0, 60.0)
    with pytest.raises(ValueError, match="lat0 < lat1"):
        GS.getis_ord_gi_sql("SELECT 1", 30.0, 60.0, -60.0)
    with pytest.raises(ValueError, match="divide 360"):
        GS.getis_ord_gi_sql("SELECT 1", 7.0, -56.0, 56.0)


def test_kde_fixed_point_truth_and_wrap(spark):
    cells = [(0, 0, 10), (11, 0, 4), (5, -1, 3)]
    offs = GS.kernel_offsets(1.0, 2)
    # integer truth: scatter each source cell's count * w_int
    acc = {}
    for cx, cy, cnt in cells:
        for dx, dy, w in offs:
            ty = cy + dy
            if CY0 <= ty < CY0 + NY:
                k = ((cx + dx) % NX, ty)
                acc[k] = acc.get(k, 0) + cnt * w
    out = GS.kde_cells(_mk_events(spark, cells), CELL, 1.0, 2, LAT0, LAT1)
    got = {(r.cell_x, r.cell_y): r.kde for r in out.collect()}
    assert set(got) == set(acc)
    for k, v in acc.items():
        assert got[k] == pytest.approx(round(v / 1e6, 6), abs=1e-9), k
    # seam: source at cx=11 contributes to cx=1 (dx=+2 wraps)
    assert (1, 0) in got


def test_kernel_offsets_contract():
    offs = GS.kernel_offsets(1.5, 3)
    # disk, not square: corner (3,3) excluded, axis (3,0) included
    ds = {(dx, dy) for dx, dy, _ in offs}
    assert (3, 0) in ds and (3, 3) not in ds
    # center weight is exactly the scale; weights symmetric
    w = {(dx, dy): w for dx, dy, w in offs}
    assert w[(0, 0)] == GS._KDE_SCALE
    assert w[(1, 2)] == w[(-1, -2)] == w[(2, 1)]
    with pytest.raises(ValueError, match="radius_cells"):
        GS.kernel_offsets(1.0, 9)
    with pytest.raises(ValueError, match="sigma_cells"):
        GS.kernel_offsets(0.0, 2)


def test_gridstats_plans(spark):
    # AQE defers exchange reuse to runtime; disable it so the static
    # plan shows the ReusedExchange (the same toggle
    # test_dedup_partitioning uses)
    df = _mk_events(spark, [(0, 0, 3), (4, 1, 2)])
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        gi = GS.getis_ord_gi(df, CELL, LAT0, LAT1)
        plan = gi._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        # the global-moment branch REUSES the cell-count exchange (one
        # corpus aggregation, as the module docstring claims) and joins
        # broadcast; scatter adds one bounded Generate
        assert "ReusedExchange" in plan
        assert "BroadcastExchange" in plan
        # cell-count agg + scatter agg only (gmom gathers via a
        # SinglePartition exchange, not hashpartitioning)
        assert plan.count("- Exchange hashpartitioning") == 2
        assert plan.count("Generate") == 1

        kde = GS.kde_cells(df, CELL, 1.0, 2, LAT0, LAT1)
        kplan = kde._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in kplan
        assert "ArrowEvalPython" not in kplan
        assert kplan.count("- Exchange hashpartitioning") == 2
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_gridstats_small_nx_guard(spark):
    # wrapped scatter needs distinct offset residues mod nx: reach 1
    # needs nx >= 3, a radius-3 kernel needs nx >= 7 — below that a
    # source cell lands twice on one target and sums double-count, so
    # every entry point must fail fast (both dialects, same rule)
    df = _mk_events(spark, [(0, 0, 1)])
    with pytest.raises(ValueError, match="nx >= 3"):
        GS.getis_ord_gi(df, 180.0, -90.0, 90.0)
    with pytest.raises(ValueError, match="nx >= 3"):
        GS.getis_ord_gi_sql("SELECT 1", 180.0, -90.0, 90.0)
    with pytest.raises(ValueError, match="nx >= 7"):
        GS.kde_cells(df, 60.0, 1.5, 3, -60.0, 60.0)
    with pytest.raises(ValueError, match="nx >= 7"):
        GS.kde_cells_sql("SELECT 1", 60.0, 1.5, 3, -60.0, 60.0)
    # at exactly nx = 2*reach+1 the residues are distinct: accepted
    GS._check_window_nx(3, 1)
    GS._check_window_nx(7, 3)


def _numpy_moran(cells):
    """Zero-filled lattice Moran's I truth: binary 3x3-minus-self
    weights, cx wraps, cy clips."""
    x = np.zeros((NX, NY), dtype=np.int64)
    for cx, cy, cnt in cells:
        x[cx % NX, cy - CY0] += cnt
    n = NX * NY
    m = x.mean()
    num = 0.0
    W = 0
    for i in range(NX):
        for j in range(NY):
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    if dx == 0 and dy == 0:
                        continue
                    tj = j + dy
                    if tj < 0 or tj >= NY:
                        continue
                    W += 1
                    num += (x[i, j] - m) * (x[(i + dx) % NX, tj] - m)
    den = ((x - m) ** 2).sum()
    return round(n / W * num / den, 6), W


def test_morans_i_numpy_truth(spark):
    # a hotspot pair (clustered -> positive I) plus scattered noise
    cells = [
        (3, 0, 9), (4, 0, 7), (3, 1, 5),   # cluster
        (9, -2, 1), (0, 1, 2), (7, -1, 1),
    ]
    truth, W = _numpy_moran(cells)
    row = GS.morans_i(_mk_events(spark, cells), CELL, LAT0, LAT1).collect()[0]
    assert row.w_sum == W
    assert row.morans_i == pytest.approx(truth, abs=2e-6)
    assert row.morans_i > 0.1  # clustered surface -> positive autocorr

    # full-lattice vertical stripes: 6 of 8 queen neighbors differ
    # (both lon neighbors and all four diagonals) -> negative I
    stripes = [
        (cx, cy, 4)
        for cx in range(0, NX, 2) for cy in range(CY0, CY0 + NY)
    ]
    truth_c, _ = _numpy_moran(stripes)
    row_c = GS.morans_i(
        _mk_events(spark, stripes), CELL, LAT0, LAT1
    ).collect()[0]
    assert row_c.morans_i == pytest.approx(truth_c, abs=2e-6)
    assert row_c.morans_i < -0.3


def test_morans_i_constant_surface_null(spark):
    # every lattice cell holds exactly one event -> den = 0 -> NULL
    cells = [(cx, cy, 1) for cx in range(NX) for cy in range(CY0, CY0 + NY)]
    row = GS.morans_i(_mk_events(spark, cells), CELL, LAT0, LAT1).collect()[0]
    assert row.morans_i is None
    assert row.sx == NX * NY


def test_morans_i_validation(spark):
    df = _mk_events(spark, [(0, 0, 1)])
    with pytest.raises(ValueError, match="2 lat rows"):
        GS.morans_i(df, CELL, -30.0, 0.0)
    with pytest.raises(ValueError, match="nx >= 3"):
        GS.morans_i_sql("SELECT 1", 180.0, -90.0, 90.0)


def test_morans_i_plan(spark):
    df = _mk_events(spark, [(0, 0, 3), (4, 1, 2)])
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = GS.morans_i(df, CELL, LAT0, LAT1)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        # the scatter branch, pair-join probe branch, and moment branch
        # all REUSE the one cell-count aggregation
        assert "ReusedExchange" in plan
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


# ------------------------------------------------------- Mann-Kendall


def _brute_mk(x):
    """Zero-filled-vector Mann-Kendall truth: S, tie-corrected var,
    continuity-corrected z."""
    T = len(x)
    S = 0
    for i in range(T):
        for j in range(i + 1, T):
            S += (x[j] > x[i]) - (x[j] < x[i])
    _, cnts = np.unique(np.asarray(x), return_counts=True)
    tt = sum(int(g) * (g - 1) * (2 * g + 5) for g in cnts)
    var = (T * (T - 1) * (2 * T + 5) - tt) / 18.0
    if var <= 0:
        return S, None
    z = (S - 1) / math.sqrt(var) if S > 0 else (
        (S + 1) / math.sqrt(var) if S < 0 else 0.0)
    return S, round(z, 6)


def _mk_events_t(spark, cells):
    """(cx, cy, bin, count) -> events at cell centers, one per count,
    timestamped inside the given bin (t0 = 0, bin = 1000 us)."""
    rows = []
    eid = 0
    for cx, cy, b, cnt in cells:
        for i in range(cnt):
            rows.append(
                (eid, b * 1000 + (i % 997), cx * CELL + 15.0,
                 cy * CELL + 15.0)
            )
            eid += 1
    return spark.createDataFrame(
        rows, "event_id bigint, ts_us bigint, lon double, lat double"
    )


def test_mann_kendall_brute_truth(spark):
    T = 8
    series = {
        (0, 0): [1, 2, 3, 4, 5, 6, 7, 8],      # strictly increasing
        (3, 1): [9, 7, 6, 5, 3, 2, 1, 1],      # decreasing w/ tie
        (5, -1): [0, 0, 1, 0, 2, 0, 0, 5],     # sparse (zero bins)
        (7, 0): [0, 0, 0, 4, 0, 0, 0, 0],      # single active bin
        (9, 1): [2, 2, 2, 2, 2, 2, 2, 2],      # constant -> var 0
    }
    cells = [
        (cx, cy, b, c)
        for (cx, cy), xs in series.items()
        for b, c in enumerate(xs) if c > 0
    ]
    out = GS.mann_kendall_cells(
        _mk_events_t(spark, cells), CELL, t0_us=0, bin_us=1000, n_bins=T
    )
    got = {(r.cell_x, r.cell_y): r for r in out.collect()}
    assert set(got) == set(series)
    for key, xs in series.items():
        S, z = _brute_mk(xs)
        r = got[key]
        assert r.mk_s == S, key
        assert r.n_events == sum(xs)
        assert r.k_bins == sum(1 for v in xs if v > 0)
        if z is None:
            assert r.mk_z is None and r.trend == "none"
        else:
            assert r.mk_z == pytest.approx(z, abs=2e-6), key
    assert got[(0, 0)].trend == "increasing"
    assert got[(3, 1)].trend == "decreasing"
    assert got[(9, 1)].mk_z is None  # all-tied: variance vanishes


def test_mann_kendall_zero_bins_match_dense(spark):
    # the closed-form present-absent split must equal running MK on the
    # dense zero-filled vector for random sparse series
    rng = np.random.RandomState(7)
    T = 12
    series = {}
    for i in range(20):
        x = rng.binomial(1, 0.4, T) * rng.randint(1, 6, T)
        if x.sum() == 0:
            x[rng.randint(T)] = 3
        series[(i % 12, i // 12)] = x.tolist()
    cells = [
        (cx, cy, b, c)
        for (cx, cy), xs in series.items()
        for b, c in enumerate(xs) if c > 0
    ]
    out = GS.mann_kendall_cells(
        _mk_events_t(spark, cells), CELL, t0_us=0, bin_us=1000, n_bins=T
    )
    got = {(r.cell_x, r.cell_y): r for r in out.collect()}
    for key, xs in series.items():
        S, z = _brute_mk(xs)
        assert got[key].mk_s == S, key
        if z is not None:
            assert got[key].mk_z == pytest.approx(z, abs=2e-6), key


def test_mann_kendall_validation(spark):
    df = _mk_events_t(spark, [(0, 0, 0, 1)])
    with pytest.raises(ValueError, match="n_bins"):
        GS.mann_kendall_cells(df, CELL, t0_us=0, bin_us=1000, n_bins=1)
    with pytest.raises(ValueError, match="bin_us"):
        GS.mann_kendall_cells_sql("SELECT 1", CELL, 0, 0, 5)
    # events outside [t0, t0 + T*bin) are excluded
    out = GS.mann_kendall_cells(
        _mk_events_t(spark, [(0, 0, 0, 2), (0, 0, 9, 3)]),
        CELL, t0_us=0, bin_us=1000, n_bins=4,
    ).collect()
    assert out[0].n_events == 2


def test_mann_kendall_plan(spark):
    df = _mk_events_t(spark, [(0, 0, 0, 2), (0, 0, 2, 1)])
    plan = GS.mann_kendall_cells(
        df, CELL, t0_us=0, bin_us=1000, n_bins=4
    )._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


# --------------------------------------------------- bivariate Moran


def _mk_typed_events(spark, cells):
    """(cx, cy, type, cnt) -> typed events at cell centers."""
    rows = []
    eid = 0
    for cx, cy, et, cnt in cells:
        for _ in range(cnt):
            rows.append(
                (eid, cx * CELL + CELL / 2.0, cy * CELL + CELL / 2.0, et)
            )
            eid += 1
    return spark.createDataFrame(
        rows, "event_id bigint, lon double, lat double, event_type string"
    )


def _numpy_biv_moran(cells):
    """Zero-filled-lattice bivariate Moran truth (queen weights,
    cx wraps, cy clips)."""
    a = np.zeros((NX, NY))
    b = np.zeros((NX, NY))
    for cx, cy, et, cnt in cells:
        (a if et == "A" else b)[cx % NX, cy - CY0] += cnt
    n = NX * NY
    ma, mb = a.mean(), b.mean()
    num = 0.0
    W = 0
    for i in range(NX):
        for j in range(NY):
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    if dx == 0 and dy == 0:
                        continue
                    tj = j + dy
                    if tj < 0 or tj >= NY:
                        continue
                    W += 1
                    num += (a[i, j] - ma) * (b[(i + dx) % NX, tj] - mb)
    den = math.sqrt(((a - ma) ** 2).sum() * ((b - mb) ** 2).sum())
    return round(n / W * num / den, 6)


def test_bivariate_moran_numpy_truth(spark):
    # A-cells ringed by B-cells (cross-clustered -> positive I_ab)
    cells = [
        (3, 0, "A", 8), (4, 0, "B", 6), (2, 0, "B", 5), (3, 1, "B", 4),
        (9, -2, "A", 2), (0, 1, "B", 1),
    ]
    truth = _numpy_biv_moran(cells)
    row = GS.bivariate_morans_i(
        _mk_typed_events(spark, cells), CELL, LAT0, LAT1,
        "event_type = 'A'", "event_type = 'B'",
    ).collect()[0]
    assert row.moran_ab == pytest.approx(truth, abs=2e-6)
    assert row.moran_ab > 0.1
    assert row.sa == 10 and row.sb == 16

    # A and B in the SAME cells, far apart -> strong avoidance of
    # neighborhoods (each A/B spike is surrounded by empty cells)
    cells2 = [(0, 0, "A", 9), (0, 0, "B", 9), (6, 1, "A", 9), (6, 1, "B", 9)]
    truth2 = _numpy_biv_moran(cells2)
    row2 = GS.bivariate_morans_i(
        _mk_typed_events(spark, cells2), CELL, LAT0, LAT1,
        "event_type = 'A'", "event_type = 'B'",
    ).collect()[0]
    assert row2.moran_ab == pytest.approx(truth2, abs=2e-6)
    assert row2.moran_ab < 0  # co-located spikes: neighbors hold none


def test_bivariate_moran_constant_class_null(spark):
    # class B uniform over the whole lattice -> its variance is 0 -> NULL
    cells = [(cx, cy, "B", 1) for cx in range(NX)
             for cy in range(CY0, CY0 + NY)]
    cells += [(3, 0, "A", 5)]
    row = GS.bivariate_morans_i(
        _mk_typed_events(spark, cells), CELL, LAT0, LAT1,
        "event_type = 'A'", "event_type = 'B'",
    ).collect()[0]
    assert row.moran_ab is None


def test_morans_i_isolated_cells_zero_pair_sum(spark):
    # no present cell touches another: the pair sum is an EMPTY
    # aggregate and must coalesce to 0 (not NULL) — regression for the
    # NULL-psum bug the bivariate avoidance case exposed
    cells = [(0, 0, 5), (6, 1, 3)]
    row = GS.morans_i(_mk_events(spark, cells), CELL, LAT0, LAT1).collect()[0]
    assert row.psum == 0
    truth, _ = _numpy_moran(cells)
    assert row.morans_i == pytest.approx(truth, abs=2e-6)
    assert row.morans_i < 0


# ------------------------------------------------- emerging hotspots


def test_emerging_hotspots_brute_truth(spark):
    """Full-pipeline truth: per-bin zero-filled Gi* z (round 6), then
    MK over each active cell's z series — computed independently in
    NumPy on a crafted space-time cube with a growing hotspot, a
    fading one, and noise."""
    T = 6
    # (cx, cy, bin, cnt): growth at (3,0); decay at (9,1); noise
    cells = []
    for b in range(T):
        cells.append((3, 0, b, 2 * b + 1))       # growing
        cells.append((9, 1, b, 2 * (T - b)))     # fading
    cells += [(0, -2, 2, 3), (6, 0, 4, 1)]
    events = []
    eid = 0
    for cx_, cy_, b, cnt in cells:
        for i in range(cnt):
            events.append(
                (eid, b * 1000 + i % 997,
                 cx_ * CELL + 15.0, cy_ * CELL + 15.0)
            )
            eid += 1
    df = spark.createDataFrame(
        events, "event_id bigint, ts_us bigint, lon double, lat double")
    out = GS.emerging_hotspots(
        df, CELL, LAT0, LAT1, t0_us=0, bin_us=1000, n_bins=T)
    got = {(r.cell_x, r.cell_y): r for r in out.collect()}

    # NumPy truth
    x = np.zeros((T, NX, NY), dtype=np.int64)
    for cx_, cy_, b, cnt in cells:
        x[b, cx_ % NX, cy_ - CY0] += cnt
    n = NX * NY
    zs = np.zeros((T, NX, NY))
    for b in range(T):
        xb = x[b]
        xbar = xb.sum() / n
        sd = math.sqrt((xb.astype(float) ** 2).sum() / n - xbar * xbar)
        for i in range(NX):
            for j in range(NY):
                wsum, w = 0, 0
                for dx in (-1, 0, 1):
                    for dy in (-1, 0, 1):
                        jj = j + dy
                        if 0 <= jj < NY:
                            w += 1
                            wsum += xb[(i + dx) % NX, jj]
                if sd > 0:
                    zs[b, i, j] = round(
                        (wsum - xbar * w)
                        / (sd * math.sqrt((n * w - w * w) / (n - 1.0))), 6)
    active = {(i, j) for b in range(T) for i in range(NX)
              for j in range(NY)
              if any(x[b, (i + dx) % NX, j + dy]
                     for dx in (-1, 0, 1) for dy in (-1, 0, 1)
                     if 0 <= j + dy < NY for b in range(T))}
    assert set(got) == {(i, j + CY0) for i, j in active}
    for (i, j) in active:
        series = zs[:, i, j].tolist()
        S, zmk = _brute_mk_z(series)
        r = got[(i, j + CY0)]
        assert r.mk_s == S, (i, j)
        if zmk is not None:
            assert r.mk_z == pytest.approx(zmk, abs=2e-6), (i, j)
    # the planted patterns classify correctly
    assert got[(3, 0)].trend == "increasing"
    assert got[(9, 1)].trend == "decreasing"


def _brute_mk_z(vals):
    T = len(vals)
    S = 0
    for i in range(T):
        for j in range(i + 1, T):
            S += (vals[j] > vals[i]) - (vals[j] < vals[i])
    _, cnts = np.unique(np.asarray(vals), return_counts=True)
    tt = sum(int(g) * (g - 1) * (2 * g + 5) for g in cnts)
    var = (T * (T - 1) * (2 * T + 5) - tt) / 18.0
    if var <= 0:
        return S, None
    z = (S - 1) / math.sqrt(var) if S > 0 else (
        (S + 1) / math.sqrt(var) if S < 0 else 0.0)
    return S, round(z, 6)


def test_emerging_hotspots_plan(spark):
    df = spark.createDataFrame(
        [(0, 0, 0.0, 0.0), (1, 1500, 15.0, 15.0)],
        "event_id bigint, ts_us bigint, lon double, lat double")
    out = GS.emerging_hotspots(
        df, CELL, LAT0, LAT1, t0_us=0, bin_us=1000, n_bins=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan or "BroadcastNestedLoop" in plan


# ----------------------------------------------------- local Moran


def _numpy_lisa(cells):
    x = np.zeros((NX, NY), dtype=np.int64)
    for cx, cy, cnt in cells:
        x[cx % NX, cy - CY0] += cnt
    n = NX * NY
    m = x.mean()
    den = ((x - m) ** 2).sum()
    out = {}
    for i in range(NX):
        for j in range(NY):
            lag = 0.0
            nbr = 0
            any_ev = x[i, j] > 0
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    if dx == 0 and dy == 0:
                        continue
                    jj = j + dy
                    if 0 <= jj < NY:
                        lag += x[(i + dx) % NX, jj] - m
                        nbr += x[(i + dx) % NX, jj]
                        any_ev = any_ev or x[(i + dx) % NX, jj] > 0
            ii = round(n / den * (x[i, j] - m) * lag, 6)
            dev = x[i, j] - m
            q = ("HH" if dev >= 0 and lag >= 0 else
                 "LL" if dev < 0 and lag < 0 else
                 "HL" if dev >= 0 else "LH")
            out[(i, j + CY0)] = (any_ev, x[i, j], nbr, ii, q)
    return out


def test_local_moran_numpy_truth(spark):
    cells = [(3, 0, 9), (4, 0, 7), (3, 1, 5), (9, -2, 1), (0, 1, 2)]
    truth = _numpy_lisa(cells)
    got = {(r.cell_x, r.cell_y): r for r in GS.local_morans_i(
        _mk_events(spark, cells), CELL, LAT0, LAT1).collect()}
    # engine emits exactly the windowed cells
    assert set(got) == {k for k, v in truth.items() if v[0]}
    for k, r in got.items():
        _, cnt, nbr, ii, q = truth[k]
        assert (r.cnt, r.nbr_sum) == (cnt, nbr), k
        assert r.lisa_i == pytest.approx(ii, abs=2e-6), k
        assert r.quadrant == q, k
    # the cluster core is HH with a clearly positive I
    assert got[(3, 0)].quadrant == "HH" and got[(3, 0)].lisa_i > 0
    # an empty cell next to the cluster is LH (low value, high lag)
    assert got[(2, 0)].quadrant == "LH"
    # the LISA sum is proportional to the global I:
    # sum_i I_i = n * global_I * (W/n) ... check via the identity
    # sum_i I_i = (n/den) * sum_i (x_i-m)*lag_i, computed over ALL
    # lattice cells (engine cells + the same-constant empties)
    g = GS.morans_i(_mk_events(spark, cells), CELL, LAT0, LAT1).collect()[0]
    lisa_all = sum(v[3] for v in truth.values())
    assert lisa_all == pytest.approx(g.morans_i * g.w_sum, abs=1e-3)


# ----------------------------------------------- focal field mean


def test_focal_value_mean_truth(spark):
    # typed values at cell centers; check cell and window means exactly
    rows = []
    eid = 0
    pts = [(3, 0, [10.0, 20.0]), (4, 0, [30.0]), (9, -2, [7.5])]
    for cx, cy, vals in pts:
        for v in vals:
            rows.append(
                (eid, cx * CELL + 15.0, cy * CELL + 15.0, v)
            )
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id bigint, lon double, lat double, value double")
    got = {(r.cell_x, r.cell_y): r for r in GS.focal_value_mean(
        df, "value", CELL, LAT0, LAT1).collect()}
    # the cell holding 10,20: own mean 15, window mean (10+20+30)/3
    a = got[(3, 0)]
    assert a.n_cell == 2 and a.n_window == 3
    assert a.cell_mean == 15.0
    assert a.window_mean == 20.0
    # a neighbor cell between the two: no own events, window = all 3
    b = got[(3, 1)]
    assert b.n_cell == 0 and b.cell_mean is None
    assert b.n_window == 3 and b.window_mean == 20.0
    # the isolated cell: window = itself
    c = got[(9, -2)]
    assert c.n_window == 1 and c.window_mean == 7.5
    # quantization: 1e-6 units exact
    assert got[(4, 0)].cell_mean == 30.0


def test_focal_value_mean_plan(spark):
    df = spark.createDataFrame(
        [(0, 15.0, 15.0, 1.5)],
        "event_id bigint, lon double, lat double, value double")
    plan = GS.focal_value_mean(df, "value", CELL, LAT0, LAT1) \
        ._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ------------------------------------------------- quadrat CSR test


def test_quadrat_csr_truth(spark):
    # all events in one cell: maximal clustering -> chi2 = n_cells * N
    # ... check exactly against the closed form on a crafted surface
    cells = [(3, 0, 12), (7, 1, 4)]
    df = _mk_events(spark, cells)
    r = GS.quadrat_csr(df, CELL, LAT0, LAT1).collect()[0]
    x = np.zeros(NX * NY)
    x[0], x[1] = 12, 4
    m = x.mean()
    chi2 = ((x - m) ** 2).sum() / m
    assert r.n_events == 16 and r.n_cells == NX * NY
    assert r.chi2 == pytest.approx(chi2, abs=1e-6)
    assert r.vmr == pytest.approx(chi2 / (NX * NY - 1), abs=1e-6)
    assert r.pattern == "clustered" and r.z > 1.96

    # one event in every cell: perfectly regular -> VMR = 0, dispersed
    uniform = [(cx, cy, 1) for cx in range(NX)
               for cy in range(CY0, CY0 + NY)]
    r2 = GS.quadrat_csr(_mk_events(spark, uniform), CELL, LAT0, LAT1) \
        .collect()[0]
    assert r2.chi2 == 0.0 and r2.vmr == 0.0
    assert r2.pattern == "dispersed"

    # empty band -> NULL chi2
    far = spark.createDataFrame(
        [(0, 0.0, 75.0)], "event_id bigint, lon double, lat double")
    r3 = GS.quadrat_csr(far, CELL, LAT0, LAT1).collect()[0]
    assert r3.n_events == 0 and r3.chi2 is None


def test_focal_value_mean_null_values_excluded(spark):
    # NULL measurements carry no information: they must not deflate
    # means or inflate window counts (review finding, r4s37)
    rows = [(0, 105.0, 15.0, 10.0), (1, 105.0, 15.0, 20.0),
            (2, 105.0, 15.0, None)]
    df = spark.createDataFrame(
        rows, "event_id bigint, lon double, lat double, value double")
    r = {(x.cell_x, x.cell_y): x for x in GS.focal_value_mean(
        df, "value", CELL, LAT0, LAT1).collect()}[(3, 0)]
    assert r.n_cell == 2 and r.n_window == 2
    assert r.cell_mean == 15.0 and r.window_mean == 15.0


def test_emerging_hotspots_single_row_guard(spark):
    df = _mk_events(spark, [(0, 0, 1)])
    with pytest.raises(ValueError, match="2 lat rows"):
        GS.emerging_hotspots(df, 30.0, 0.0, 30.0, t0_us=0,
                             bin_us=1000, n_bins=3)
    with pytest.raises(ValueError, match="2 lat rows"):
        GS.emerging_hotspots_sql("SELECT 1", 30.0, 0.0, 30.0, t0_us=0,
                                 bin_us=1000, n_bins=3)


def _wrapped_queen_pairs():
    """All ordered neighbor pairs ((cx,iy),(jx,jy)) of the test lattice
    (lon wraps, lat clips)."""
    for cx in range(NX):
        for iy in range(NY):
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    if dx == 0 and dy == 0:
                        continue
                    jy = iy + dy
                    if 0 <= jy < NY:
                        yield (cx, iy), ((cx + dx) % NX, jy)


def _lattice(cells):
    x = np.zeros((NX, NY), dtype=np.int64)
    for cx, cy, cnt in cells:
        x[cx % NX, cy - CY0] += cnt
    return x


def test_gearys_c_numpy_truth(spark):
    cells = [
        (3, 0, 9), (4, 0, 7), (3, 1, 5),
        (9, -2, 1), (0, 1, 2), (7, -1, 1),
    ]
    x = _lattice(cells)
    n = NX * NY
    m = x.sum() / n
    num = sum(
        (int(x[a]) - int(x[b])) ** 2 for a, b in _wrapped_queen_pairs()
    )
    W = sum(1 for _ in _wrapped_queen_pairs())
    den = ((x - m) ** 2).sum()
    truth = (n - 1) * num / (2.0 * W * den)
    row = GS.gearys_c(_mk_events(spark, cells), CELL, LAT0, LAT1).collect()[0]
    assert row.w_sum == W
    assert row.gearys_c == pytest.approx(truth, abs=2e-6)
    # clustered surface -> C < 1, and Moran/Geary must agree in sign
    assert row.gearys_c < 1.0
    assert row.z < 0.0


def test_gearys_c_constant_surface_null(spark):
    cells = [(cx, cy, 1) for cx in range(NX) for cy in range(CY0, CY0 + NY)]
    row = GS.gearys_c(_mk_events(spark, cells), CELL, LAT0, LAT1).collect()[0]
    assert row.gearys_c is None


def test_join_counts_numpy_truth(spark):
    cells = [
        (3, 0, 9), (4, 0, 7), (3, 1, 5), (4, 1, 3),   # hot block
        (9, -2, 1), (0, 1, 2), (7, -1, 4),
    ]
    thresh = 3
    x = _lattice(cells)
    b = (x >= thresh).astype(np.int64)
    bb = sum(int(b[a] and b[p]) for a, p in _wrapped_queen_pairs()) // 2
    bw = sum(
        int(b[a] != b[p]) for a, p in _wrapped_queen_pairs()
    ) // 2
    W = sum(1 for _ in _wrapped_queen_pairs())
    ww = W // 2 - bb - bw
    row = GS.join_counts(
        _mk_events(spark, cells), CELL, LAT0, LAT1, hot_threshold=thresh
    ).collect()[0]
    assert (row.j_bb, row.j_bw, row.j_ww) == (bb, bw, ww)
    assert row.n_black == int(b.sum())
    assert row.j_bb + row.j_bw + row.j_ww == W // 2
    # free-sampling moments, brute from the p-powers
    p = b.sum() / (NX * NY)
    s0 = W
    s1 = 2 * s0
    s2 = 0
    rows_ = np.zeros((NX, NY), dtype=np.int64)
    for a, _ in _wrapped_queen_pairs():
        rows_[a] += 1
    s2 = int((4 * rows_.astype(np.int64) ** 2).sum())
    e_bb = s0 / 2.0 * p * p
    var_bb = (
        s1 * p**2 + (s2 - 2 * s1) * p**3 + (s1 - s2) * p**4
    ) / 4.0
    assert row.e_bb == pytest.approx(e_bb, abs=2e-6)
    assert row.var_bb == pytest.approx(var_bb, abs=2e-6)
    assert row.z_bb == pytest.approx(
        (bb - e_bb) / math.sqrt(var_bb), abs=2e-6
    )
    # a contiguous hot block clusters
    assert row.pattern == "clustered"


def test_join_counts_validation(spark):
    df = _mk_events(spark, [(0, 0, 1)])
    with pytest.raises(ValueError, match="hot_threshold"):
        GS.join_counts(df, CELL, LAT0, LAT1, hot_threshold=0)


def test_gearys_join_counts_plans(spark):
    df = _mk_events(spark, [(0, 0, 3), (4, 1, 2), (4, 0, 3)])
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        for build in (
            lambda: GS.gearys_c(df, CELL, LAT0, LAT1),
            lambda: GS.join_counts(df, CELL, LAT0, LAT1, hot_threshold=2),
        ):
            plan = build()._jdf.queryExecution().executedPlan().toString()
            assert "BatchEvalPython" not in plan
            assert "ArrowEvalPython" not in plan
            # scatter / pair-probe / moment branches reuse the one
            # cell-count (resp. black-cell) aggregation
            assert "ReusedExchange" in plan
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


# ------------------------------------ space-time permutation scan


def _mk_events_st(spark, triples):
    """(cx, cy, bin, count) -> events at cell centers in bin (t0=0,
    bin=1000 us)."""
    rows = []
    eid = 0
    for cx, cy, b, cnt in triples:
        for i in range(cnt):
            rows.append((eid, b * 1000 + (i % 997),
                         cx * CELL + 15.0, cy * CELL + 15.0))
            eid += 1
    return spark.createDataFrame(
        rows, "event_id bigint, ts_us bigint, lon double, lat double")


def test_spacetime_scan_brute_truth(spark):
    # background: one event per bin in two far-apart cells; cluster:
    # cell (3,0) gets a burst of 6 in bins 2-3
    data = (
        [(0, 0, b, 1) for b in range(8)]
        + [(6, 1, b, 1) for b in range(8)]
        + [(3, 0, 2, 3), (3, 0, 3, 3)]
    )
    out = GS.spacetime_scan(
        _mk_events_st(spark, data), CELL, LAT0, LAT1,
        t0_us=0, bin_us=1000, n_bins=8, w_max=3, min_count=2,
    ).collect()
    rows = {(r.cx, r.cy, r.t_start, r.w_bins): r for r in out}
    # brute truth for the w=2 cylinder centered at the burst
    N = 8 + 8 + 6
    S = 6            # 3x3 around (3,0) over all time (only the burst)
    T = 2 + 2 + 6    # bins 2-3 totals
    o = 6
    e = S * T / N
    import math as m
    llr = o * m.log(o / e) + (N - o) * m.log((N - o) / (N - e))
    r = rows[(3, 0, 2, 2)]
    assert (r.obs, r.s_marg, r.t_marg) == (o, S, T)
    assert r.expected == pytest.approx(e, abs=2e-6)
    assert r.llr == pytest.approx(llr, abs=2e-6)
    assert r.relative_risk == pytest.approx(o / e, abs=2e-6)
    # the burst cylinder ties for top LLR (neighboring centers whose
    # 3x3 base covers the same lone burst cell share S and obs)
    assert r.llr == max(q.llr for q in out)


def test_spacetime_scan_marginal_only_patterns_score_zero(spark):
    # PURELY SPATIAL hotspot (one cell always busy, constant in time):
    # obs = S*T/N exactly for full-height cylinders; partial windows
    # too (uniform time) -> no cylinder has obs > expected anywhere
    # it matters; with min excess the keep rule drops everything
    flat = [(3, 0, b, 5) for b in range(6)] + [
        (9, 1, b, 1) for b in range(6)
    ]
    out = GS.spacetime_scan(
        _mk_events_st(spark, flat), CELL, LAT0, LAT1,
        t0_us=0, bin_us=1000, n_bins=6, w_max=3, min_count=1,
        llr_min=0.001,
    ).collect()
    assert out == []


def test_spacetime_scan_validation(spark):
    df = _mk_events_st(spark, [(0, 0, 0, 1)])
    with pytest.raises(ValueError, match="w_max"):
        GS.spacetime_scan(df, CELL, LAT0, LAT1, 0, 1000, 4, w_max=9)
    with pytest.raises(ValueError, match="min_count"):
        GS.spacetime_scan(
            df, CELL, LAT0, LAT1, 0, 1000, 4, min_count=0)


def test_spacetime_scan_plan(spark):
    df = _mk_events_st(spark, [(0, 0, 0, 2), (3, 1, 1, 2)])
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = GS.spacetime_scan(
            df, CELL, LAT0, LAT1, 0, 1000, 4,
        )._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        # r6: the counts aggregation is localCheckpoint-pinned, so the
        # cylinder and both marginals read the materialized table
        # (Scan ExistingRDD) instead of depending on runtime
        # ReusedExchange to dedupe re-inlined corpus aggregations —
        # the plan must contain NO (cx, cy, tb) grouping at all (it ran
        # once, before this plan) and several reads of the pinned RDD
        assert "ReusedExchange" not in plan
        assert plan.count("Scan ExistingRDD") >= 3
        # corpus agg (the only count(1) grouping) absent from the plan —
        # every in-plan aggregate is a lattice-bounded sum over the
        # pinned counts table
        assert "count(1)" not in plan
        assert plan.count("BroadcastHashJoin") >= 2
        assert "SortMergeJoin" not in plan
        assert "CartesianProduct" not in plan
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


# ------------------------------------------- Getis-Ord General G


def test_general_g_exact_permutation_enumeration(spark):
    """The 1992 randomization Var[G] B-coefficient formula, verified
    against EXACT exhaustive enumeration of all value-to-cell
    assignments on a 4x2 wrapped lattice (8! = 40320 permutations) —
    an independent proof the coefficients are right, not a formula
    re-derivation."""
    import itertools

    nx, ny = 4, 2
    cells = [(x, y) for x in range(nx) for y in range(ny)]
    W = {}
    for (x, y) in cells:
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                if dx == 0 and dy == 0:
                    continue
                jy = y + dy
                if 0 <= jy < ny:
                    W[((x, y), ((x + dx) % nx, jy))] = 1
    vals = [7, 3, 2, 1, 0, 0, 0, 0]
    # the operator on the same lattice: cell_deg=90 -> nx=4, 2 lat rows
    rows, eid = [], 0
    for (cx, iy), v in zip(cells, vals):
        for _ in range(v):
            rows.append((eid, cx * 90.0 + 45.0, (iy - 1) * 90.0 + 45.0))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id bigint, lon double, lat double")
    r = GS.general_g(df, 90.0, -90.0, 90.0).collect()[0]
    # formula must equal the exact enumeration mean/variance
    gs_all = []
    for perm in itertools.permutations(vals):
        x = dict(zip(cells, perm))
        num = sum(x[a] * x[b] for (a, b) in W)
        den = sum(x[a] * x[b] for a in cells for b in cells if a != b)
        gs_all.append(num / den)
    gs_all = np.array(gs_all)
    assert r.e_g == pytest.approx(gs_all.mean(), rel=1e-12)
    assert r.var_g == pytest.approx(gs_all.var(), abs=2e-6)
    # observed G for THIS assignment
    x = dict(zip(cells, vals))
    g_obs = (sum(x[a] * x[b] for (a, b) in W)
             / sum(x[a] * x[b] for a in cells for b in cells if a != b))
    assert r.general_g == pytest.approx(g_obs, abs=2e-6)


def test_general_g_high_vs_low_discrimination(spark):
    # HIGH values adjacent -> G above expectation
    hi = [(3, 0, 9), (4, 0, 8), (3, 1, 7), (1, -2, 1), (8, 1, 1),
          (10, -1, 1)]
    r_hi = GS.general_g(_mk_events(spark, hi), CELL, LAT0, LAT1).collect()[0]
    assert r_hi.general_g > r_hi.e_g
    # the same multiset with the HIGH values scattered far apart ->
    # G below expectation (low/zero cells dominate adjacency)
    lo = [(3, 0, 9), (9, 0, 8), (0, -2, 7), (6, 1, 1), (1, 1, 1),
          (11, -1, 1)]
    r_lo = GS.general_g(_mk_events(spark, lo), CELL, LAT0, LAT1).collect()[0]
    assert r_lo.general_g < r_hi.general_g


# ------------------------------------------------ per-cell lag ACF


def test_acf_cells_brute_truth(spark):
    # cell A: alternating high-low (negative lag-1 ACF), cell B: a
    # monotone ramp with gaps (zero bins exercise the closed form)
    T = 8
    a = [(3, 0, b, 5 if b % 2 == 0 else 1) for b in range(T)]
    b_ = [(9, 1, b, c) for b, c in [(0, 1), (2, 2), (3, 3), (6, 6)]]
    out = GS.acf_cells(
        _mk_events_st(spark, a + b_), CELL, t0_us=0, bin_us=1000,
        n_bins=T, max_lag=3,
    ).collect()
    got = {((r.cx, r.cy), r.lag): r for r in out}

    def brute(vals):
        x = np.zeros(T)
        for _, _, bb, c in vals:
            x[bb] += c
        m = x.mean()
        c0 = ((x - m) ** 2).sum()
        return {
            k: ((x[k:] - m) * (x[:-k] - m)).sum() / c0
            for k in (1, 2, 3)
        }
    for cell, vals in ((3, 0), a), ((9, 1), b_):
        truth = brute(vals)
        for k in (1, 2, 3):
            r = got[(cell, k)]
            assert r.acf == pytest.approx(truth[k], abs=2e-6), (cell, k)
            assert r.significant == (abs(truth[k]) > 1.96 / np.sqrt(T))
    # alternation -> strongly negative lag-1, positive lag-2
    assert got[((3, 0), 1)].acf < -0.5
    assert got[((3, 0), 2)].acf > 0.3


def test_acf_cells_constant_series_null(spark):
    rows = [(3, 0, b, 2) for b in range(4)]
    out = GS.acf_cells(
        _mk_events_st(spark, rows), CELL, t0_us=0, bin_us=1000,
        n_bins=4, max_lag=2,
    ).collect()
    assert all(r.acf is None for r in out)


def test_acf_cells_validation(spark):
    df = _mk_events_st(spark, [(0, 0, 0, 1)])
    with pytest.raises(ValueError, match="max_lag"):
        GS.acf_cells(df, CELL, 0, 1000, 4, max_lag=4)


# --------------------------------- emerging hotspot categories


def test_ehs_category_ladder_truth_table(spark):
    T = 10  # p90 = 9
    cases = [
        # nh nc lh lc frh frc trend          expected
        (1, 0, 1, 0, 1, 0, "none", "new hot spot"),
        (3, 0, 1, 0, 3, 0, "increasing", "consecutive hot spot"),
        (9, 0, 1, 0, 5, 0, "increasing", "intensifying hot spot"),
        (9, 0, 0, 0, 0, 1, "none", "historical hot spot"),
        (10, 0, 1, 0, 10, 0, "decreasing", "diminishing hot spot"),
        (9, 0, 1, 0, 2, 0, "none", "persistent hot spot"),
        (4, 2, 1, 0, 1, 0, "none", "oscillating hot spot"),
        (4, 0, 1, 0, 1, 0, "sporadic-check", "sporadic hot spot"),
        (0, 1, 0, 1, 0, 1, "none", "new cold spot"),
        (0, 3, 0, 1, 0, 3, "none", "consecutive cold spot"),
        (0, 9, 0, 1, 0, 5, "decreasing", "intensifying cold spot"),
        (0, 9, 0, 0, 1, 0, "none", "historical cold spot"),
        (0, 10, 0, 1, 0, 10, "increasing", "diminishing cold spot"),
        (0, 9, 0, 1, 0, 2, "none", "persistent cold spot"),
        (2, 4, 0, 1, 1, 1, "none", "oscillating cold spot"),
        (0, 4, 0, 1, 0, 1, "none", "sporadic cold spot"),
        (0, 0, 0, 0, 0, 0, "none", "no pattern"),
    ]
    df = spark.createDataFrame(
        [c[:7] for c in cases],
        "nh bigint, nc bigint, last_hot bigint, last_cold bigint, "
        "frh bigint, frc bigint, trend string")
    out = df.selectExpr(
        GS._ehs_category_case(T) + " AS category").collect()
    for (got,), (*_, want) in zip(out, cases):
        assert got == want, (got, want)


def test_emerging_categories_new_hot_e2e(spark):
    # uniform background everywhere except one cell that bursts ONLY
    # in the final bin -> that cell must classify 'new hot spot'
    T = 6
    bg = [(cx, cy, b, 1)
          for cx in range(0, NX, 3) for cy in (CY0, CY0 + 2)
          for b in range(T)]
    burst = [(6, 0, T - 1, 40)]
    out = GS.emerging_hotspot_categories(
        _mk_events_st(spark, bg + burst), CELL, LAT0, LAT1,
        t0_us=0, bin_us=1000, n_bins=T,
    ).collect()
    got = {(r.cell_x, r.cell_y): r for r in out}
    r = got[(6, 0)]
    assert r.n_hot == 1 and r.final_hot_run == 1
    assert r.category == "new hot spot"
    # agreement with the trend surface on the same input
    tr = {(q.cell_x, q.cell_y): q for q in GS.emerging_hotspots(
        _mk_events_st(spark, bg + burst), CELL, LAT0, LAT1,
        t0_us=0, bin_us=1000, n_bins=T,
    ).collect()}
    assert tr[(6, 0)].trend == r.trend


# --------------------------------------------------- local Geary


def test_local_geary_permutation_enumeration(spark):
    """E[c_i]/Var[c_i] under conditional randomization, verified by
    exhaustive 7!-placement enumeration on the 4x2 wrapped lattice."""
    import itertools

    nx, ny = 4, 2
    cells = [(x, y) for x in range(nx) for y in range(ny)]

    def neighbors(c):
        out = []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                if dx == 0 and dy == 0:
                    continue
                jy = c[1] + dy
                if 0 <= jy < ny:
                    out.append(((c[0] + dx) % nx, jy))
        return out

    i = (0, 1)  # iy=1 -> cy = 0 row
    vals = {(0, 1): 4, (1, 0): 7, (2, 1): 3, (3, 0): 2, (1, 1): 1}
    rows, eid = [], 0
    for (cx, iy), v in vals.items():
        for _ in range(v):
            rows.append((eid, cx * 90.0 + 45.0, (iy - 1) * 90.0 + 45.0))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id bigint, lon double, lat double")
    out = {(r.cell_x, r.cell_y): r
           for r in GS.local_gearys_c(df, 90.0, -90.0, 90.0).collect()}
    r = out[(0, 0)]  # cell i in (cx, cy) coords: iy=1 -> cy=0

    x = vals[i]
    others = [c for c in cells if c != i]
    ovals = [vals.get(c, 0) for c in others]
    nb = neighbors(i)
    cs = []
    for perm in itertools.permutations(ovals):
        asn = dict(zip(others, perm))
        asn[i] = x
        cs.append(sum((x - asn[j]) ** 2 for j in nb))
    cs = np.array(cs, dtype=float)
    # observed c_i for THIS assignment
    asn = {c: vals.get(c, 0) for c in cells}
    c_obs = sum((x - asn[j]) ** 2 for j in nb)
    assert r.c_i == pytest.approx(c_obs, abs=1e-9)
    assert r.e_ci == pytest.approx(cs.mean(), abs=2e-6)
    z = (c_obs - cs.mean()) / cs.std()
    assert r.z == pytest.approx(z, abs=2e-6)


def test_local_geary_similar_block_flags(spark):
    # a uniform block of equal-count cells deep inside an empty
    # lattice: interior cells of the block see identical neighbors ->
    # tiny c_i -> 'similar' side; block cells are above the global
    # mean -> 'high-high'
    block = [(cx, cy, 6) for cx in range(3, 8) for cy in range(-1, 2)]
    out = {(r.cell_x, r.cell_y): r for r in GS.local_gearys_c(
        _mk_events(spark, block), CELL, LAT0, LAT1).collect()}
    center = out[(5, 0)]
    assert center.c_i == 0.0
    assert center.z < -1.96
    assert center.label == "high-high"


# -------------------------------------------------- Theil-Sen slope


def test_sen_slope_numpy_truth(spark):
    import numpy as np

    T = 8
    series = {
        (0, 0): [1, 2, 3, 4, 5, 6, 7, 8],      # perfect slope 1
        (3, 1): [9, 7, 6, 5, 3, 2, 1, 1],      # decreasing w/ tie
        (5, -1): [0, 0, 1, 0, 2, 0, 0, 5],     # sparse (zero bins)
        (9, 1): [2, 2, 2, 2, 2, 2, 2, 2],      # constant -> slope 0
    }
    cells = [
        (cx, cy, b, c)
        for (cx, cy), xs in series.items()
        for b, c in enumerate(xs) if c > 0
    ]
    out = GS.sen_slope_cells(
        _mk_events_t(spark, cells), CELL, t0_us=0, bin_us=1000, n_bins=T
    )
    got = {(r.cell_x, r.cell_y): r for r in out.collect()}
    assert set(got) == set(series)
    for key, xs in series.items():
        slopes = sorted(
            (xs[j] - xs[i]) / (j - i)
            for i in range(T) for j in range(i + 1, T)
        )
        S = sum(
            np.sign(xs[j] - xs[i])
            for i in range(T) for j in range(i + 1, T)
        )
        sen = float(np.median(slopes))
        r = got[key]
        assert r.mk_s == S, key
        assert r.sen_slope == pytest.approx(sen, abs=1e-6), key
    assert got[(0, 0)].sen_slope == pytest.approx(1.0)
    assert got[(9, 1)].sen_slope == pytest.approx(0.0)


def test_sen_slope_s_matches_mann_kendall(spark):
    # the cube pair-set S must equal the closed-form present/absent S
    # for every cell — two independent derivations of the same BIGINT
    cells = [
        (1, 0, 0, 2), (1, 0, 3, 1), (1, 0, 7, 9),
        (2, 2, 1, 4), (2, 2, 2, 4), (2, 2, 6, 1),
        (4, -2, 5, 3),
    ]
    df = _mk_events_t(spark, cells)
    kw = dict(t0_us=0, bin_us=1000, n_bins=9)
    mk = {(r.cell_x, r.cell_y): r.mk_s
          for r in GS.mann_kendall_cells(df, CELL, **kw).collect()}
    sen = {(r.cell_x, r.cell_y): r.mk_s
           for r in GS.sen_slope_cells(df, CELL, **kw).collect()}
    assert mk == sen


def test_sen_slope_plan(spark):
    df = _mk_events_t(spark, [(0, 0, 0, 1), (0, 0, 1, 2)])
    plan = GS.sen_slope_cells(
        df, CELL, t0_us=0, bin_us=1000, n_bins=4
    )._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


# ------------------------------------------ seasonal Mann-Kendall


def _brute_smk(xs, P):
    """Brute seasonal Kendall on the dense zero-filled series xs."""
    import numpy as np

    T = len(xs)
    Ts = T // P
    S = 0
    V = 0.0
    for s in range(P):
        sub = [xs[s + P * k] for k in range(Ts)]
        S += sum(
            np.sign(sub[j] - sub[i])
            for i in range(Ts) for j in range(i + 1, Ts)
        )
        ties = {}
        for v in sub:
            ties[v] = ties.get(v, 0) + 1
        tt = sum(g * (g - 1) * (2 * g + 5) for g in ties.values())
        V += (Ts * (Ts - 1) * (2 * Ts + 5) - tt) / 18.0
    if V <= 0:
        return S, None
    z = (S - 1) / V ** 0.5 if S > 0 else (
        (S + 1) / V ** 0.5 if S < 0 else 0.0)
    return S, z


def test_seasonal_mk_brute_truth(spark):
    T, P = 12, 3
    series = {
        # within-season increase in every season -> strong trend
        (0, 0): [1, 5, 9, 2, 6, 10, 3, 7, 11, 4, 8, 12],
        # pure seasonal cycle, NO within-season trend -> S = 0
        (3, 1): [9, 1, 5, 9, 1, 5, 9, 1, 5, 9, 1, 5],
        # sparse with zero bins
        (5, -1): [0, 0, 1, 0, 2, 0, 0, 5, 0, 3, 0, 0],
        # constant -> all seasons tied, variance 0
        (9, 1): [2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2],
    }
    cells = [
        (cx, cy, b, c)
        for (cx, cy), xs in series.items()
        for b, c in enumerate(xs) if c > 0
    ]
    out = GS.seasonal_mk_cells(
        _mk_events_t(spark, cells), CELL, t0_us=0, bin_us=1000,
        n_bins=T, n_seasons=P,
    )
    got = {(r.cell_x, r.cell_y): r for r in out.collect()}
    assert set(got) == set(series)
    for key, xs in series.items():
        S, z = _brute_smk(xs, P)
        r = got[key]
        assert r.mk_s == S, key
        assert r.n_events == sum(xs)
        if z is None:
            assert r.mk_z is None and r.trend == "none"
        else:
            assert r.mk_z == pytest.approx(z, abs=2e-6), key
    # the cycle-only cell: a plain MK would see spurious structure,
    # the seasonal test reports exactly S = 0
    assert got[(3, 1)].mk_s == 0
    assert got[(0, 0)].trend == "increasing"


def test_seasonal_mk_validation(spark):
    df = _mk_events_t(spark, [(0, 0, 0, 1)])
    with pytest.raises(ValueError, match="divide"):
        GS.seasonal_mk_cells(df, CELL, 0, 1000, n_bins=10, n_seasons=3)
    with pytest.raises(ValueError, match=">= 2"):
        GS.seasonal_mk_cells(df, CELL, 0, 1000, n_bins=10, n_seasons=1)
    with pytest.raises(ValueError, match="pairs"):
        GS.seasonal_mk_cells(df, CELL, 0, 1000, n_bins=10, n_seasons=10)


def test_seasonal_mk_reduces_to_mk_at_one_season_shape(spark):
    # P seasons of an UNSEASONAL series: the summed statistic keeps
    # the trend direction (sanity coupling with mann_kendall_cells)
    cells = [(1, 1, b, b + 1) for b in range(12)]
    df = _mk_events_t(spark, cells)
    smk = GS.seasonal_mk_cells(
        df, CELL, 0, 1000, n_bins=12, n_seasons=4
    ).collect()[0]
    mk = GS.mann_kendall_cells(
        df, CELL, 0, 1000, n_bins=12
    ).collect()[0]
    assert smk.trend == mk.trend == "increasing"
    assert 0 < smk.mk_s < mk.mk_s  # fewer comparable pairs per season


def test_seasonal_mk_plan(spark):
    df = _mk_events_t(spark, [(0, 0, 0, 1), (0, 0, 1, 2)])
    plan = GS.seasonal_mk_cells(
        df, CELL, 0, 1000, n_bins=4, n_seasons=2
    )._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


# --------------------------------------------- Pettitt change point


def _brute_pettitt(xs, alpha=0.05):
    import math

    T = len(xs)
    sgn = lambda d: (d > 0) - (d < 0)  # noqa: E731
    U = [
        sum(
            sgn(xs[i] - xs[j])
            for i in range(t + 1) for j in range(t + 1, T)
        )
        for t in range(T - 1)
    ]
    K = max(abs(u) for u in U)
    cp = min(t for t in range(T - 1) if abs(U[t]) == K)
    p = min(1.0, 2.0 * math.exp(-6.0 * K * K / (T ** 3 + T ** 2)))
    sig = 6.0 * K * K >= (T ** 3 + T ** 2) * math.log(2.0 / alpha)
    shift = (
        "none" if not sig
        else ("decreasing" if U[cp] > 0 else "increasing")
    )
    return K, cp, U[cp], p, shift


def test_pettitt_brute_truth(spark):
    T = 12
    series = {
        # clean upward step at midpoint -> significant 'increasing'
        (0, 0): [1, 1, 1, 1, 1, 1, 9, 9, 9, 9, 9, 9],
        # clean downward step -> significant 'decreasing'
        (3, 1): [7, 7, 7, 7, 7, 7, 1, 1, 1, 1, 1, 1],
        # constant -> U identically 0, p = 1, earliest-bin tie-break
        (9, 1): [2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2],
        # sparse with zero bins
        (5, -1): [0, 0, 3, 0, 1, 0, 0, 5, 2, 0, 0, 4],
        # off-center weak step (exercises argmax position)
        (7, 0): [4, 4, 4, 5, 5, 5, 5, 5, 5, 5, 5, 5],
    }
    cells = [
        (cx, cy, b, c)
        for (cx, cy), xs in series.items()
        for b, c in enumerate(xs) if c > 0
    ]
    out = GS.pettitt_cells(
        _mk_events_t(spark, cells), CELL, t0_us=0, bin_us=1000,
        n_bins=T,
    )
    got = {(r.cell_x, r.cell_y): r for r in out.collect()}
    assert set(got) == set(series)
    for key, xs in series.items():
        K, cp, ucp, p, shift = _brute_pettitt(xs)
        r = got[key]
        assert r.k_stat == K, key
        assert r.cp_bin == cp, key
        assert r.u_cp == ucp, key
        assert r.p_value == pytest.approx(p, abs=2e-6), key
        assert r.shift == shift, key
        assert r.n_events == sum(xs)
    assert got[(0, 0)].shift == "increasing"
    assert got[(3, 1)].shift == "decreasing"
    assert got[(9, 1)].k_stat == 0 and got[(9, 1)].cp_bin == 0
    assert got[(9, 1)].p_value == 1.0


def test_pettitt_validation(spark):
    df = _mk_events_t(spark, [(0, 0, 0, 1)])
    with pytest.raises(ValueError, match=">= 4"):
        GS.pettitt_cells(df, CELL, 0, 1000, n_bins=3)
    with pytest.raises(ValueError, match="alpha"):
        GS.pettitt_cells(df, CELL, 0, 1000, n_bins=8, alpha=1.5)


def test_pettitt_plan(spark):
    df = _mk_events_t(spark, [(0, 0, 0, 1), (0, 0, 1, 2)])
    plan = GS.pettitt_cells(
        df, CELL, 0, 1000, n_bins=4
    )._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


# --------------------------------------------------- SNHT change point


def _brute_snht(xs, t_crit):
    T = len(xs)
    S = sum(xs)
    mean = S / T
    var = sum((x - mean) ** 2 for x in xs) / T  # population form
    if var == 0:
        return None, None, None, "none"
    best = None
    for t in range(T - 1):
        k = t + 1
        z1 = (sum(xs[:k]) / k - mean)
        z2 = (sum(xs[k:]) / (T - k) - mean)
        tt = (k * z1 * z1 + (T - k) * z2 * z2) / var
        if best is None or tt > best[0] + 1e-12:
            a = T * sum(xs[:k]) - k * S
            best = (tt, t, a)
    t0, cp, a = best
    sig = t0 >= t_crit
    shift = (
        "none" if not sig
        else ("decreasing" if a > 0 else "increasing")
    )
    return t0, cp, a, shift


def test_snht_brute_truth(spark):
    T = 12
    t_crit = 6.95
    series = {
        (0, 0): [1, 1, 1, 1, 1, 1, 9, 9, 9, 9, 9, 9],   # up step
        (3, 1): [7, 7, 7, 7, 7, 7, 1, 1, 1, 1, 1, 1],   # down step
        (9, 1): [2] * 12,                                # constant
        (5, -1): [0, 0, 3, 0, 1, 0, 0, 5, 2, 0, 0, 4],  # sparse
        (7, 0): [4, 4, 4, 5, 5, 5, 5, 5, 5, 5, 5, 5],   # early weak step
    }
    cells = [
        (cx, cy, b, c)
        for (cx, cy), xs in series.items()
        for b, c in enumerate(xs) if c > 0
    ]
    out = GS.snht_cells(
        _mk_events_t(spark, cells), CELL, t0_us=0, bin_us=1000,
        n_bins=T, t_crit=t_crit,
    )
    got = {(r.cell_x, r.cell_y): r for r in out.collect()}
    assert set(got) == set(series)
    for key, xs in series.items():
        t0, cp, a, shift = _brute_snht(xs, t_crit)
        r = got[key]
        if t0 is None:
            assert r.t0_stat is None and r.cp_bin is None, key
            assert r.a_cp is None, key
        else:
            assert r.t0_stat == pytest.approx(t0, abs=2e-6), key
            assert r.cp_bin == cp, key
            assert r.a_cp == a, key
        assert r.shift == shift, key
        assert r.n_events == sum(xs)
    assert got[(0, 0)].shift == "increasing"
    assert got[(3, 1)].shift == "decreasing"
    assert got[(9, 1)].shift == "none"


def test_snht_validation(spark):
    df = _mk_events_t(spark, [(0, 0, 0, 1)])
    with pytest.raises(ValueError, match=">= 4"):
        GS.snht_cells(df, CELL, 0, 1000, n_bins=3, t_crit=7.0)
    with pytest.raises(ValueError, match="t_crit"):
        GS.snht_cells(df, CELL, 0, 1000, n_bins=8, t_crit=0.0)


def test_snht_plan(spark):
    df = _mk_events_t(spark, [(0, 0, 0, 1), (0, 0, 1, 2)])
    plan = GS.snht_cells(
        df, CELL, 0, 1000, n_bins=4, t_crit=7.0
    )._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


# ------------------------------------------ FDR-corrected hotspots


def _as_norm_sf2(z):
    """The same A&S 26.2.17 two-sided tail the engine evaluates."""
    az = abs(z)
    t = 1.0 / (1.0 + 0.2316419 * az)
    poly = ((((1.330274429 * t - 1.821255978) * t + 1.781477937) * t
             - 0.356563782) * t + 0.319381530)
    phi = math.exp(-az * az / 2.0) * 0.3989422804014327
    return 2.0 * phi * poly * t


def test_hotspot_fdr_brute_truth(spark):
    cells = [(11, 0, 40), (0, 0, 30), (5, 1, 7), (3, -2, 12), (8, -1, 2)]
    q = 0.05
    out = GS.hotspot_fdr(_mk_events(spark, cells), CELL, LAT0, LAT1, q=q)
    rows = out.collect()
    gi = {(r.cell_x, r.cell_y): r.gi_z
          for r in GS.getis_ord_gi(
              _mk_events(spark, cells), CELL, LAT0, LAT1).collect()}
    # replicate BH in Python from the engine's own round-6 z values
    ranked = sorted(gi.items(), key=lambda kv: (-abs(kv[1]), kv[0]))
    m = len(ranked)
    ps = [round(_as_norm_sf2(z), 6) for _, z in ranked]
    imax = max(
        (i + 1 for i in range(m) if ps[i] <= (i + 1) * q / m), default=0
    )
    got = {(r.cell_x, r.cell_y): r for r in rows}
    assert set(got) == set(gi)
    for i, (key, z) in enumerate(ranked):
        r = got[key]
        assert r.m_tests == m
        assert r.p_rank == i + 1, key
        # accuracy: A&S tail within 2e-6 of the exact erfc tail
        exact = math.erfc(abs(z) / math.sqrt(2.0))
        assert r.p_value == pytest.approx(exact, abs=2e-6), key
        assert r.p_value == pytest.approx(ps[i], abs=1e-9), key
        want = (
            "not significant" if i + 1 > imax
            else ("hot" if z > 0 else "cold")
        )
        assert r.label == want, key
    # the crafted hotspot must survive FDR; far-tail sanity
    assert imax >= 1
    assert got[(11, 0)].label == "hot" or got[(0, 0)].label == "hot"


def test_hotspot_fdr_all_null_and_validation(spark):
    # near-uniform counts -> no p small enough -> everything uncorrected
    cells = [(cx, 0, 1) for cx in range(NX)]
    out = GS.hotspot_fdr(_mk_events(spark, cells), CELL, LAT0, LAT1)
    assert all(r.label == "not significant" for r in out.collect())
    with pytest.raises(ValueError, match="q must be"):
        GS.hotspot_fdr(_mk_events(spark, cells), CELL, LAT0, LAT1, q=1.0)


def test_hotspot_fdr_plan(spark):
    df = _mk_events(spark, [(0, 0, 3), (5, 1, 1)])
    plan = GS.hotspot_fdr(
        df, CELL, LAT0, LAT1
    )._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


# ------------------------------------------------ location quotient


def test_location_quotient_brute(spark):
    # categories placed so shares differ per cell
    rows = []
    eid = 0
    placed = [
        (0, 0, "a", 6), (0, 0, "b", 2),
        (3, 1, "a", 1), (3, 1, "b", 3),
        (7, -1, "b", 4),
    ]
    for cx, cy, cat, cnt in placed:
        lon = cx * CELL + CELL / 2.0
        lat = cy * CELL + CELL / 2.0
        for _ in range(cnt):
            rows.append((eid, lon, lat, cat))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id bigint, lon double, lat double, et string")
    out = {(r.cell_x, r.cell_y, r.category): r
           for r in GS.location_quotient(df, "et", CELL).collect()}
    N = sum(c for *_, c in placed)
    cat_tot = {}
    cell_tot = {}
    for cx, cy, cat, cnt in placed:
        cat_tot[cat] = cat_tot.get(cat, 0) + cnt
        cell_tot[(cx, cy)] = cell_tot.get((cx, cy), 0) + cnt
    assert set(out) == {(cx, cy, cat) for cx, cy, cat, _ in placed}
    for cx, cy, cat, cnt in placed:
        r = out[(cx, cy, cat)]
        assert r.n_events == cnt
        assert r.cell_total == cell_tot[(cx, cy)]
        assert r.cat_total == cat_tot[cat]
        lq = (cnt * N) / (cell_tot[(cx, cy)] * cat_tot[cat])
        assert r.lq == pytest.approx(round(lq, 6), abs=1e-9)
    # single-category cell: share 1 / global share
    assert out[(7, -1, "b")].lq == pytest.approx(
        round(1.0 / (cat_tot["b"] / N), 6), abs=1e-9)


def test_location_quotient_plan(spark):
    df = spark.createDataFrame(
        [(0, 10.0, 10.0, "a")],
        "event_id bigint, lon double, lat double, et string")
    plan = GS.location_quotient(
        df, "et", CELL
    )._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


# ------------------------------------------- gliding-box lacunarity


def _brute_lacunarity(cells, sizes):
    """All-anchor gliding-box truth on the wrapped/zero-filled lattice."""
    x = np.zeros((NX, NY), dtype=np.int64)
    for cx, cy, cnt in cells:
        x[cx % NX, cy - CY0] += cnt
    out = {}
    for r in sizes:
        masses = []
        for ax in range(NX):
            for ay in range(NY - r + 1):
                m = sum(
                    x[(ax + i) % NX, ay + j]
                    for i in range(r) for j in range(r)
                )
                masses.append(int(m))
        sm = sum(masses)
        sq = sum(m * m for m in masses)
        lam = len(masses) * sq / (sm * sm) if sm else None
        out[r] = (len(masses), sm, sq, lam)
    return out


def test_lacunarity_brute_truth(spark):
    # clumped mass near the seam (wrap) + isolated cells + an edge row
    cells = [(11, 0, 9), (0, 0, 7), (5, 1, 3), (3, -2, 5), (8, -1, 1)]
    sizes = [1, 2, 3]
    truth = _brute_lacunarity(cells, sizes)
    out = {r.box_cells: r for r in GS.lacunarity(
        _mk_events(spark, cells), sizes, CELL, LAT0, LAT1).collect()}
    assert set(out) == set(sizes)
    for r in sizes:
        nb, sm, sq, lam = truth[r]
        got = out[r]
        assert got.n_boxes == nb, r
        assert got.sum_mass == sm, r
        assert got.sum_mass_sq == sq, r
        assert got.lacunarity == pytest.approx(round(lam, 6), abs=1e-9)
    # uniform field -> lacunarity exactly 1 at r=1
    uni = [(cx, cy, 2) for cx in range(NX) for cy in range(CY0, CY0 + NY)]
    got1 = {r.box_cells: r for r in GS.lacunarity(
        _mk_events(spark, uni), [1], CELL, LAT0, LAT1).collect()}[1]
    assert got1.lacunarity == 1.0


def test_lacunarity_validation_and_plan(spark):
    df = _mk_events(spark, [(0, 0, 1)])
    with pytest.raises(ValueError, match="ascending"):
        GS.lacunarity(df, [2, 2], CELL, LAT0, LAT1)
    with pytest.raises(ValueError, match="lat band"):
        GS.lacunarity(df, [NY + 1], CELL, LAT0, LAT1)
    plan = GS.lacunarity(
        df, [1, 2], CELL, LAT0, LAT1
    )._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


# ------------------------------------------------ Moran correlogram


def _ring_w(nx, ny, cy0, d):
    """Brute ring weight matrix over the wrapped/clipped lattice."""
    idx = {(cx, cy0 + iy): cx * ny + iy
           for cx in range(nx) for iy in range(ny)}
    n = nx * ny
    w = np.zeros((n, n), dtype=np.int64)
    for (cx, cy), i in idx.items():
        for dx in range(-d, d + 1):
            for dy in range(-d, d + 1):
                if max(abs(dx), abs(dy)) != d:
                    continue
                j = idx.get(((cx + dx) % nx, cy + dy))
                if j is not None:
                    w[i, j] = 1
    return w, idx


def _brute_moran(x, w):
    n = len(x)
    m = x.mean()
    dev = x - m
    den = (dev * dev).sum()
    num = dev @ w @ dev
    return (n / w.sum()) * num / den


def test_correlogram_brute_truth_all_lags(spark):
    cells = [(11, 0, 9), (0, 0, 7), (5, 1, 3), (3, -2, 5), (8, -1, 2)]
    out = {r.lag: r for r in GS.moran_correlogram(
        _mk_events(spark, cells), 3, CELL, LAT0, LAT1).collect()}
    x = np.zeros(NX * NY, dtype=np.float64)
    for cx, cy, cnt in cells:
        x[(cx % NX) * NY + (cy - CY0)] += cnt
    for d in (1, 2, 3):
        w, _ = _ring_w(NX, NY, CY0, d)
        assert (w == w.T).all()
        r = out[d]
        assert r.w_sum == w.sum(), d
        assert r.morans_i == pytest.approx(
            round(_brute_moran(x, w), 6), abs=1e-9), d
        # psum / rsum cross-checks
        assert r.psum == int(x @ w @ x), d
        assert r.rsum == int((w.sum(axis=1) * x).sum()), d
    # lag-1 ring == the 3x3-minus-self window: must equal morans_i
    mi = GS.morans_i(_mk_events(spark, cells), CELL, LAT0, LAT1)
    assert out[1].morans_i == mi.collect()[0].morans_i


def test_correlogram_exhaustive_permutation_variance(spark):
    # 8-cell lattice (90-degree cells, full lat range): the analytic
    # Cliff-Ord randomization moments must equal EXACT enumeration
    # over all 8! permutations of the value vector
    import itertools

    vals = [3, 1, 4, 1, 5, 9, 2, 6]
    nx, ny, cy0 = 4, 2, -1
    rows = []
    eid = 0
    for cx in range(nx):
        for iy in range(ny):
            cnt = vals[cx * ny + iy]
            for _ in range(cnt):
                rows.append((eid, cx * 90.0 + 45.0, (cy0 + iy) * 90.0 + 45.0))
                eid += 1
    df = spark.createDataFrame(
        rows, "event_id bigint, lon double, lat double")
    out = GS.moran_correlogram(df, 1, 90.0, -90.0, 90.0).collect()[0]
    w, _ = _ring_w(nx, ny, cy0, 1)
    x0 = np.array(vals, dtype=np.float64)
    isamples = np.array([
        _brute_moran(np.array(p, dtype=np.float64), w)
        for p in itertools.permutations(vals)
    ])
    assert out.morans_i == pytest.approx(
        round(_brute_moran(x0, w), 6), abs=1e-9)
    assert out.e_i == pytest.approx(isamples.mean(), abs=1e-12)
    assert out.var_i == pytest.approx(isamples.var(), abs=2e-6)
    assert out.e_i == pytest.approx(-1.0 / 7.0, abs=1e-12)


def test_correlogram_validation_and_plan(spark):
    df = _mk_events(spark, [(0, 0, 2), (1, 0, 1)])
    with pytest.raises(ValueError, match="max_lag"):
        GS.moran_correlogram(df, 0, CELL, LAT0, LAT1)
    # wrap cover: lag 6 rings need nx >= 13 > 12
    with pytest.raises(ValueError, match="collision-free"):
        GS.moran_correlogram(df, 6, CELL, LAT0, LAT1)
    plan = GS.moran_correlogram(
        df, 2, CELL, LAT0, LAT1
    )._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


# ------------------------------------------ Morisita dispersion index


def test_morisita_brute_and_invariance(spark):
    cells = [(0, 0, 10), (1, 0, 10), (5, 1, 4)]
    out = GS.morisita_index(
        _mk_events(spark, cells), CELL, LAT0, LAT1).collect()[0]
    xs = [c for *_, c in cells]
    N = sum(xs)
    Q = NX * NY
    i_d = Q * sum(x * (x - 1) for x in xs) / (N * (N - 1))
    m = N / Q
    s2 = sum(x * x for x in xs) / Q - m * m
    k = m * m / (s2 - m)
    assert out.n_cells == Q and out.n_events == N
    assert out.morisita == pytest.approx(round(i_d, 6), abs=1e-9)
    assert out.nb_k == pytest.approx(round(k, 6), abs=1e-9)
    # density invariance: doubling every count leaves I_d ~ unchanged
    # (exactly: Q*sum(2x(2x-1))/(2N(2N-1)) -> I_d as N grows), while
    # VMR doubles; check the direction
    cells2 = [(cx, cy, 2 * c) for cx, cy, c in cells]
    out2 = GS.morisita_index(
        _mk_events(spark, cells2), CELL, LAT0, LAT1).collect()[0]
    assert abs(out2.morisita - out.morisita) < 0.05 * out.morisita
    # single stacked cell -> I_d == Q exactly
    stack = GS.morisita_index(
        _mk_events(spark, [(3, 1, 7)]), CELL, LAT0, LAT1).collect()[0]
    assert stack.morisita == float(Q)


def test_morisita_poisson_regime_null_k(spark):
    # one event per cell everywhere: s2 = 0 < m -> k NULL; I_d = 0
    uni = [(cx, cy, 1) for cx in range(NX) for cy in range(CY0, CY0 + NY)]
    out = GS.morisita_index(
        _mk_events(spark, uni), CELL, LAT0, LAT1).collect()[0]
    assert out.nb_k is None
    assert out.morisita == 0.0
    plan = GS.morisita_index(
        _mk_events(spark, uni), CELL, LAT0, LAT1
    )._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "BatchEvalPython" not in plan and "CartesianProduct" not in plan


# ------------------------------------------- per-cell category diversity


def test_cell_diversity_brute(spark):
    rows = []
    eid = 0
    placed = [
        (0, 0, "a", 4), (0, 0, "b", 4),          # even 2-way mix
        (3, 1, "a", 9), (3, 1, "b", 1),          # skewed mix
        (7, -1, "c", 5),                          # single category
        (9, 1, "a", 1),                           # single event
    ]
    for cx, cy, cat, cnt in placed:
        lon = cx * CELL + CELL / 2.0
        lat = cy * CELL + CELL / 2.0
        for _ in range(cnt):
            rows.append((eid, lon, lat, cat))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id bigint, lon double, lat double, et string")
    out = {(r.cell_x, r.cell_y): r
           for r in GS.cell_diversity(df, "et", CELL).collect()}
    cells = {}
    for cx, cy, cat, cnt in placed:
        cells.setdefault((cx, cy), {})[cat] = cnt
    assert set(out) == set(cells)
    for key, comp in cells.items():
        r = out[key]
        n = sum(comp.values())
        assert r.n_events == n
        assert r.richness == len(comp)
        if n < 2:
            assert r.shannon is None and r.simpson is None
            continue
        h = math.log(n) - sum(
            c * math.log(c) for c in comp.values()) / n
        pie = 1.0 - sum(c * (c - 1) for c in comp.values()) / (n * (n - 1))
        assert r.shannon == pytest.approx(h, abs=2e-6), key
        assert r.simpson == pytest.approx(round(pie, 6), abs=1e-9), key
    # even 2-way mix: H = ln 2; single category: H = 0, PIE = 0
    assert out[(0, 0)].shannon == pytest.approx(math.log(2), abs=2e-6)
    assert out[(7, -1)].shannon == 0.0
    assert out[(7, -1)].simpson == 0.0
    plan = GS.cell_diversity(
        df, "et", CELL)._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "BatchEvalPython" not in plan and "CartesianProduct" not in plan


# ------------------------------------------------ segregation indices


def test_segregation_brute(spark):
    rows = []
    eid = 0
    placed = [
        (0, 0, "a", 8), (0, 0, "b", 2),
        (3, 1, "a", 2), (3, 1, "b", 8),
        (7, -1, "b", 5), (9, 1, "a", 3), (9, 1, "c", 4),
    ]
    for cx, cy, cat, cnt in placed:
        lon = cx * CELL + CELL / 2.0
        lat = cy * CELL + CELL / 2.0
        for _ in range(cnt):
            rows.append((eid, lon, lat, cat))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id bigint, lon double, lat double, et string")
    out = {r.category: r
           for r in GS.segregation_indices(df, "et", CELL).collect()}
    cells = {}
    for cx, cy, cat, cnt in placed:
        cells.setdefault((cx, cy), {})[cat] = cnt
    cats = {cat for *_, cat, _ in [(a, b, c, d) for a, b, c, d in placed]}
    N = sum(cnt for *_, cnt in placed)
    for catg in cats:
        X = sum(comp.get(catg, 0) for comp in cells.values())
        Y = N - X
        d = 0.5 * sum(
            abs(comp.get(catg, 0) / X - (sum(comp.values())
                - comp.get(catg, 0)) / Y)
            for comp in cells.values()
        )
        iso = sum(
            (comp.get(catg, 0) / X)
            * (comp.get(catg, 0) / sum(comp.values()))
            for comp in cells.values()
        )
        r = out[catg]
        assert r.cat_total == X and r.rest_total == Y
        assert r.dissimilarity == pytest.approx(d, abs=2e-6), catg
        assert r.isolation == pytest.approx(iso, abs=2e-6), catg
    # perfect segregation for a category alone in its cells?
    solo = GS.segregation_indices(
        spark.createDataFrame(
            [(0, 15.0, 15.0, "x"), (1, 75.0, 15.0, "y")],
            "event_id bigint, lon double, lat double, et string"),
        "et", CELL).collect()
    for r in solo:
        assert r.dissimilarity == 1.0
        assert r.isolation == 1.0
    # single-category corpus -> D NULL (empty complement)
    one = GS.segregation_indices(
        spark.createDataFrame(
            [(0, 15.0, 15.0, "x")],
            "event_id bigint, lon double, lat double, et string"),
        "et", CELL).collect()[0]
    assert one.dissimilarity is None
    plan = GS.segregation_indices(
        df, "et", CELL)._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "BatchEvalPython" not in plan and "CartesianProduct" not in plan


# --------------------------------- spatial concentration scalars


def test_concentration_brute(spark):
    cells = [(0, 0, 10), (1, 0, 10), (5, 1, 4), (3, -2, 1)]
    out = GS.spatial_concentration(
        _mk_events(spark, cells), CELL, LAT0, LAT1).collect()[0]
    n = NX * NY
    xs = [0] * (n - len(cells)) + sorted(c for *_, c in cells)
    N = sum(xs)
    gini = (2 * sum((i + 1) * x for i, x in enumerate(xs))
            - (n + 1) * N) / (n * N)
    hoover = 0.5 * sum(abs(x / N - 1.0 / n) for x in xs)
    m = N / n
    theil = sum((x / N) * math.log(x / m) for x in xs if x > 0)
    assert out.n_cells == n and out.n_events == N
    assert out.gini == pytest.approx(round(gini, 6), abs=1e-9)
    assert out.hoover == pytest.approx(hoover, abs=2e-6)
    assert out.theil == pytest.approx(theil, abs=2e-6)
    # uniform surface: all three exactly 0
    uni = [(cx, cy, 3) for cx in range(NX) for cy in range(CY0, CY0 + NY)]
    u = GS.spatial_concentration(
        _mk_events(spark, uni), CELL, LAT0, LAT1).collect()[0]
    assert u.gini == 0.0 and u.hoover == 0.0 and u.theil == 0.0
    # everything in one cell: gini -> (n-1)/n, hoover -> (n-1)/n,
    # theil -> ln(n)
    one = GS.spatial_concentration(
        _mk_events(spark, [(4, 0, 9)]), CELL, LAT0, LAT1).collect()[0]
    assert one.gini == pytest.approx(round((n - 1) / n, 6), abs=1e-9)
    assert one.hoover == pytest.approx(round((n - 1) / n, 6), abs=1e-9)
    assert one.theil == pytest.approx(math.log(n), abs=2e-6)
    plan = GS.spatial_concentration(
        _mk_events(spark, cells), CELL, LAT0, LAT1
    )._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "BatchEvalPython" not in plan and "CartesianProduct" not in plan


# --------------------------------------------- seasonal chi-square


def test_seasonal_chi2_brute(spark):
    T, P = 12, 3
    series = {
        (0, 0): [9, 0, 0, 9, 0, 0, 9, 0, 0, 9, 0, 0],  # pure season 0
        (3, 1): [2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2],  # uniform
        (5, -1): [1, 0, 0, 0, 2, 0, 0, 0, 3, 1, 0, 0],  # mixed
    }
    cells = [
        (cx, cy, b, c)
        for (cx, cy), xs in series.items()
        for b, c in enumerate(xs) if c > 0
    ]
    out = {(r.cell_x, r.cell_y): r for r in GS.seasonal_chi2_cells(
        _mk_events_t(spark, cells), CELL, t0_us=0, bin_us=1000,
        n_bins=T, n_seasons=P, chi2_crit=5.991,
    ).collect()}
    assert set(out) == set(series)
    for key, xs in series.items():
        seas = [sum(xs[b] for b in range(T) if b % P == s)
                for s in range(P)]
        n = sum(seas)
        chi2 = sum((x - n / P) ** 2 for x in seas) / (n / P)
        r = out[key]
        assert r.n_events == n
        assert r.chi2 == pytest.approx(round(chi2, 6), abs=1e-9), key
        mx = max(seas)
        assert r.peak_count == mx
        assert r.peak_season == min(
            s for s in range(P) if seas[s] == mx), key
        assert r.seasonal == (
            "seasonal" if chi2 >= 5.991 else "uniform"), key
    assert out[(0, 0)].seasonal == "seasonal"
    assert out[(0, 0)].peak_season == 0
    assert out[(3, 1)].chi2 == 0.0
    assert out[(3, 1)].seasonal == "uniform"


def test_seasonal_chi2_validation_and_plan(spark):
    df = _mk_events_t(spark, [(0, 0, 0, 1)])
    with pytest.raises(ValueError, match="whole number"):
        GS.seasonal_chi2_cells(df, CELL, 0, 1000, 10, 3, 5.991)
    with pytest.raises(ValueError, match="n_seasons"):
        GS.seasonal_chi2_cells(df, CELL, 0, 1000, 12, 1, 5.991)
    with pytest.raises(ValueError, match="chi2_crit"):
        GS.seasonal_chi2_cells(df, CELL, 0, 1000, 12, 3, 0.0)
    plan = GS.seasonal_chi2_cells(
        df, CELL, 0, 1000, 12, 3, 5.991
    )._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "BatchEvalPython" not in plan and "CartesianProduct" not in plan


# ------------------------------------------------ local join counts


def test_ljc_enumeration_and_brute(spark):
    import itertools

    # hot cells: a seam-adjacent pair + an isolated hot + background
    cells = [(11, 0, 50), (0, 0, 40), (5, 1, 45), (3, -2, 2), (8, -1, 3)]
    out = {(r.cell_x, r.cell_y): r for r in GS.local_join_counts(
        _mk_events(spark, cells), CELL, LAT0, LAT1).collect()}
    # threshold: 110% of active mean (28) = 30.8 -> hot = {50, 40, 45}
    hot = {(11, 0), (0, 0), (5, 1)}
    assert set(out) == hot
    n = NX * NY
    p1 = len(hot)
    for key in hot:
        r = out[key]
        assert r.n_hot == p1
        # brute hot-neighbor count on the wrapped lattice
        cx0, cy00 = key
        bb = sum(
            1
            for dx in (-1, 0, 1) for dy in (-1, 0, 1)
            if (dx, dy) != (0, 0)
            and ((cx0 + dx) % NX, cy00 + dy) in hot
        )
        assert r.bb == bb, key
        w = 5 if cy00 in (CY0, CY0 + NY - 1) else 8
        # exhaustive conditional enumeration: place the other p1-1 hot
        # markers in the other n-1 slots; BB = hot markers among the
        # w neighbor slots
        kk = p1 - 1
        others = n - 1
        cnt_e = {}
        for ones in itertools.combinations(range(others), kk):
            inw = sum(1 for o in ones if o < w)  # wlog first w slots
            cnt_e[inw] = cnt_e.get(inw, 0) + 1
        tot = sum(cnt_e.values())
        e_enum = sum(v * c / tot for v, c in cnt_e.items())
        var_enum = sum(v * v * c / tot for v, c in cnt_e.items()) - e_enum ** 2
        assert r.e_bb == pytest.approx(e_enum, abs=2e-6), key
        if var_enum > 0:
            z = (bb - e_enum) / math.sqrt(var_enum)
            assert r.z == pytest.approx(z, abs=2e-6), key
    # the seam pair must see each other: bb >= 1 both sides
    assert out[(11, 0)].bb >= 1 and out[(0, 0)].bb >= 1
    assert out[(5, 1)].bb == 0


def test_ljc_validation_and_plan(spark):
    df = _mk_events(spark, [(0, 0, 3), (1, 0, 1)])
    with pytest.raises(ValueError, match="hot_pct"):
        GS.local_join_counts(df, CELL, LAT0, LAT1, hot_pct=0)
    plan = GS.local_join_counts(
        df, CELL, LAT0, LAT1
    )._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "BatchEvalPython" not in plan and "CartesianProduct" not in plan


# ----------------------------------------- EB-smoothed rates


def test_eb_rates_brute(spark):
    rows = []
    eid = 0
    # (cell, cases, non-cases): a big-base cell at the overall rate, a
    # tiny-base outlier (1/2 = 0.5 rate), a zero-case cell
    placed = [
        (0, 0, 60, 40), (3, 1, 1, 1), (7, -1, 0, 50), (9, 1, 5, 45),
    ]
    for cx, cy, ncase, nother in placed:
        lon = cx * CELL + CELL / 2.0
        lat = cy * CELL + CELL / 2.0
        for _ in range(ncase):
            rows.append((eid, lon, lat, "case")); eid += 1
        for _ in range(nother):
            rows.append((eid, lon, lat, "other")); eid += 1
    df = spark.createDataFrame(
        rows, "event_id bigint, lon double, lat double, et string")
    out = {(r.cell_x, r.cell_y): r
           for r in GS.eb_rates(df, "et", "'case'", CELL).collect()}
    X = sum(c for *_, c, _ in placed)
    T = sum(c + o for *_, c, o in placed)
    K = len(placed)
    m = X / T
    v = sum(
        (c + o) * ((c / (c + o)) - m) ** 2 for *_, c, o in placed
    ) / T - m * K / T
    v = max(0.0, v)
    for cx, cy, c, o in placed:
        t_i = c + o
        r_i = c / t_i
        w = v / (v + m / t_i)
        theta = w * r_i + (1 - w) * m
        got = out[(cx, cy)]
        assert got.cases == c and got.base == t_i
        assert got.raw_rate == pytest.approx(round(r_i, 6), abs=1e-9)
        assert got.eb_rate == pytest.approx(theta, abs=2e-6), (cx, cy)
        assert got.shrink_w == pytest.approx(w, abs=2e-6), (cx, cy)
    # shrinkage direction: the tiny outlier moves MUCH closer to m
    # than its raw rate; the big cell barely moves
    big, tiny = out[(0, 0)], out[(3, 1)]
    assert abs(tiny.eb_rate - m) < abs(tiny.raw_rate - m) * 0.75
    assert abs(big.eb_rate - big.raw_rate) < 0.05
    # small base shrinks harder
    assert tiny.shrink_w < big.shrink_w


def test_eb_rates_degenerate_and_plan(spark):
    # all cells at the identical rate -> v <= 0 -> every eb_rate == m
    rows = []
    eid = 0
    for cx in range(4):
        for _ in range(2):
            rows.append((eid, cx * CELL + 15.0, 15.0, "case")); eid += 1
        for _ in range(6):
            rows.append((eid, cx * CELL + 15.0, 15.0, "other")); eid += 1
    df = spark.createDataFrame(
        rows, "event_id bigint, lon double, lat double, et string")
    out = GS.eb_rates(df, "et", "'case'", CELL).collect()
    for r in out:
        assert r.eb_rate == 0.25
        assert r.shrink_w == 0.0
    plan = GS.eb_rates(
        df, "et", "'case'", CELL
    )._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "BatchEvalPython" not in plan and "CartesianProduct" not in plan


# ------------------------------------------------ field Moran's I


def _present_w(locs):
    """3x3-minus-self adjacency restricted to the present cells."""
    idx = {loc: i for i, loc in enumerate(locs)}
    n = len(locs)
    w = np.zeros((n, n), dtype=np.int64)
    for (cx, cy), i in idx.items():
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                if (dx, dy) == (0, 0):
                    continue
                j = idx.get(((cx + dx) % NX, cy + dy))
                if j is not None:
                    w[i, j] = 1
    return w


def _brute_field_moran(vals, w):
    x = np.asarray(vals, dtype=np.float64)
    n = len(x)
    m = x.mean()
    dev = x - m
    den = (dev * dev).sum()
    return (n / w.sum()) * (dev @ w @ dev) / den


def test_field_moran_exhaustive_permutation(spark):
    import itertools

    # 7 present cells: a seam-adjacent pair, a chain, two isolates
    locs = [(11, 0), (0, 0), (5, 1), (5, 0), (6, 1), (2, -2), (8, -1)]
    vals = [4.25, 3.75, 1.0, 1.5, 0.75, 9.0, 2.0]
    rows = [
        (i, cx * CELL + CELL / 2.0, cy * CELL + CELL / 2.0, v)
        for i, ((cx, cy), v) in enumerate(zip(locs, vals))
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, lon double, lat double, value double")
    out = GS.morans_i_field(df, "value", CELL, LAT0, LAT1).collect()[0]
    w = _present_w(locs)
    assert (w == w.T).all()
    assert out.n_cells == len(locs)
    assert out.w_sum == w.sum()
    qv = [round(v * 100) for v in vals]  # engine quantization
    i_obs = _brute_field_moran(qv, w)
    assert out.morans_i == pytest.approx(round(i_obs, 6), abs=1e-9)
    samples = np.array([
        _brute_field_moran(p, w)
        for p in itertools.permutations(qv)
    ])
    assert out.e_i == pytest.approx(round(samples.mean(), 6), abs=1e-9)
    assert out.var_i == pytest.approx(samples.var(), abs=2e-6)


def test_field_moran_mean_null_and_plan(spark):
    # two events in one cell: exact half-up mean of quantized values;
    # NULL values dropped
    rows = [
        (0, 15.0, 15.0, 2.255), (1, 15.2, 15.1, 2.265),
        (2, 45.0, 15.0, None), (3, 45.1, 15.1, 3.0),
        (4, 75.0, 15.0, 1.0), (5, 105.0, 15.0, 4.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, lon double, lat double, value double")
    out = GS.morans_i_field(df, "value", CELL, LAT0, LAT1).collect()[0]
    assert out.n_cells == 4  # the NULL-only point doesn't create a cell
    plan = GS.morans_i_field(
        df, "value", CELL, LAT0, LAT1
    )._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "BatchEvalPython" not in plan and "CartesianProduct" not in plan


# ------------------------------------------ POT GPD tail per cell


def test_gpd_tail_brute(spark):
    rows = []
    eid = 0
    # cell A: heavy-ish tail; cell B: no variance (all equal excess);
    # cell C: k=2 (below fit gate); cell D: no exceedance (dropped)
    series = {
        (0, 0): [10.5, 11.0, 12.25, 15.0, 20.0, 3.0, 4.0],
        (3, 1): [11.0, 11.0, 11.0, 2.0],
        (7, -1): [12.0, 13.0, 1.0],
        (9, 1): [5.0, 6.0],
    }
    for (cx0, cy0), vals in series.items():
        lon = cx0 * CELL + CELL / 2.0
        lat = cy0 * CELL + CELL / 2.0
        for v in vals:
            rows.append((eid, lon, lat, v)); eid += 1
    df = spark.createDataFrame(
        rows, "event_id bigint, lon double, lat double, value double")
    u, retm = 10.0, 500
    out = {(r.cell_x, r.cell_y): r for r in GS.gpd_tail_cells(
        df, "value", threshold=u, cell_deg=CELL, ret_m=retm
    ).collect()}
    assert set(out) == {(0, 0), (3, 1), (7, -1)}
    # brute replay for cell A
    vals = series[(0, 0)]
    exc = [round((v - u) * 100) for v in vals if v > u]
    k, n = len(exc), len(vals)
    mbar = sum(exc) / (100 * k)
    s2 = (sum(e * e for e in exc) / 1e4 - k * mbar * mbar) / (k - 1)
    ratio = mbar * mbar / s2
    xi = (1 - ratio) / 2
    sg = mbar * (ratio + 1) / 2
    rl = u + sg / xi * ((retm * k / n) ** xi - 1)
    r = out[(0, 0)]
    assert r.n_total == n and r.n_exceed == k and r.u == u
    assert r.mean_excess == pytest.approx(mbar, abs=2e-6)
    assert r.gpd_xi == pytest.approx(xi, abs=2e-6)
    assert r.gpd_sigma == pytest.approx(sg, abs=2e-6)
    assert r.return_level == pytest.approx(rl, abs=2e-5)
    assert r.return_level > max(vals)  # extrapolates past the sample
    # degenerate cells: zero variance / k < 3 -> NULL fit, counts kept
    assert out[(3, 1)].n_exceed == 3 and out[(3, 1)].gpd_xi is None
    assert out[(7, -1)].n_exceed == 2 and out[(7, -1)].gpd_xi is None


def test_gpd_validation_and_plan(spark):
    df = spark.createDataFrame(
        [(0, 15.0, 15.0, 20.0)],
        "event_id bigint, lon double, lat double, value double")
    with pytest.raises(ValueError, match="ret_m"):
        GS.gpd_tail_cells(df, "value", 10.0, CELL, ret_m=0)
    plan = GS.gpd_tail_cells(
        df, "value", 10.0, CELL
    )._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "BatchEvalPython" not in plan and "CartesianProduct" not in plan


# ------------------------------------------------------- cosinor


def test_cosinor_brute(spark):
    T = P = 12
    A, C, K = 5.0, 9.0, 4  # planted amplitude / mesor / peak bin
    series = {
        (0, 0): [int(round(C + A * math.cos(2 * math.pi * (t - K) / P)))
                 for t in range(T)],            # planted rhythm
        (3, 1): [7] * T,                        # constant -> flat
        (5, -1): [13, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],  # spike at 0
    }
    cells = [
        (cx, cy, b, c)
        for (cx, cy), xs in series.items()
        for b, c in enumerate(xs) if c > 0
    ]
    out = {(r.cell_x, r.cell_y): r for r in GS.cosinor_cells(
        _mk_events_t(spark, cells), CELL, t0_us=0, bin_us=1000,
        n_bins=T, period=P, f_crit=4.256,  # F(2, 9) 95%
    ).collect()}
    assert set(out) == set(series)
    for key, xs in series.items():
        n = sum(xs)
        # numpy least-squares truth on the zero-filled series
        t = np.arange(T)
        X = np.column_stack([
            np.ones(T),
            np.cos(2 * np.pi * t / P),
            np.sin(2 * np.pi * t / P),
        ])
        beta, _, _, _ = np.linalg.lstsq(X, np.array(xs, float), rcond=None)
        m, a, b = beta
        amp = math.hypot(a, b)
        sst = float(np.sum((np.array(xs, float) - n / T) ** 2))
        ssh = T / 2.0 * (a * a + b * b)
        r = out[key]
        assert r.n_events == n
        assert r.mesor == pytest.approx(round(n / T, 6), abs=1e-9)
        assert r.amplitude == pytest.approx(amp, abs=1e-6), key
        if sst == 0.0:
            assert r.r2 is None and r.f_stat is None
            assert r.rhythm == "flat"
        else:
            assert r.r2 == pytest.approx(min(ssh / sst, 1.0), abs=1e-6)
            fstat = ssh * (T - 3) / (2.0 * (sst - ssh))
            assert r.f_stat == pytest.approx(fstat, abs=1e-4), key
            assert r.rhythm == (
                "rhythmic" if fstat >= 4.256 else "flat"), key
        if amp > 1e-9:
            peak = (math.atan2(b, a) * P / (2 * math.pi)) % P
            d = abs(r.peak_bin - peak)  # circular: 0 == P
            assert min(d, P - d) < 1e-6, key
    assert out[(0, 0)].rhythm == "rhythmic"
    assert out[(0, 0)].peak_bin == pytest.approx(K, abs=0.05)
    assert out[(3, 1)].amplitude == 0.0
    assert out[(5, -1)].peak_bin == pytest.approx(0.0, abs=1e-6)


def test_cosinor_validation_and_plan(spark):
    df = _mk_events_t(spark, [(0, 0, 0, 1)])
    with pytest.raises(ValueError, match="whole number"):
        GS.cosinor_cells(df, CELL, 0, 1000, 10, 4, 4.0)
    with pytest.raises(ValueError, match="period"):
        GS.cosinor_cells(df, CELL, 0, 1000, 12, 2, 4.0)
    with pytest.raises(ValueError, match="f_crit"):
        GS.cosinor_cells(df, CELL, 0, 1000, 12, 12, 0.0)
    plan = GS.cosinor_cells(
        df, CELL, 0, 1000, 12, 12, 4.0
    )._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "BatchEvalPython" not in plan and "CartesianProduct" not in plan


# ------------------------------------------- Wilcoxon rank-sum shift


def _mk_valued(spark, rows):
    """(cx, cy, ts_us, value) -> events at cell centers."""
    data = [
        (i, t, cx * CELL + 15.0, cy * CELL + 15.0, float(v))
        for i, (cx, cy, t, v) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data, "event_id bigint, ts_us bigint, lon double, lat double, "
        "value double"
    )


def _brute_mw(before, after):
    """(u1, z) truth: mid-rank U, tie-corrected variance, continuity."""
    u1 = sum(
        1.0 if a > b else (0.5 if a == b else 0.0)
        for a in before for b in after
    )
    n1, n2 = len(before), len(after)
    N = n1 + n2
    from collections import Counter

    tied = sum(t ** 3 - t for t in Counter(before + after).values())
    var = n1 * n2 / 12.0 * ((N + 1) - tied / (N * (N - 1)))
    if var <= 0 or n1 == 0 or n2 == 0:
        return u1, None
    num = u1 - n1 * n2 / 2.0
    num += -0.5 if num > 0 else (0.5 if num < 0 else 0.0)
    return u1, num / math.sqrt(var)


def test_rank_sum_shift_brute(spark):
    SPLIT = 1000
    series = {
        (0, 0): ([1.0, 1.5, 2.0, 1.25, 1.75] * 4,
                 [5.0, 6.5, 5.25, 7.0, 6.0] * 4),   # clear increase
        (3, 1): ([2.5] * 6, [2.5] * 8),              # all tied
        (5, -1): ([1.0, 3.0, 2.0], []),              # one-sided
        (7, 2): ([1.0, 2.0, 2.0, 3.0], [2.0, 2.5]),  # ties across sides
    }
    rows = []
    for (cx, cy), (bef, aft) in series.items():
        rows += [(cx, cy, 10 + i, v) for i, v in enumerate(bef)]
        rows += [(cx, cy, SPLIT + 10 + i, v) for i, v in enumerate(aft)]
    out = {(r.cell_x, r.cell_y): r for r in GS.rank_sum_shift_cells(
        _mk_valued(spark, rows), CELL, split_us=SPLIT
    ).collect()}
    assert set(out) == set(series)
    for key, (bef, aft) in series.items():
        u1, z = _brute_mw(bef, aft)
        r = out[key]
        assert r.n_before == len(bef) and r.n_after == len(aft)
        assert r.u_stat == pytest.approx(u1, abs=1e-9), key
        if z is None:
            assert r.z is None, key
        else:
            assert r.z == pytest.approx(z, abs=1e-6), key
            assert r.shift == (
                "increase" if z <= -1.96
                else ("decrease" if z >= 1.96 else "stable")), key
    assert out[(0, 0)].shift == "increase"
    assert out[(3, 1)].z is None and out[(3, 1)].shift == "stable"
    assert out[(5, -1)].z is None and out[(5, -1)].shift is None


def test_rank_sum_shift_validation_and_plan(spark):
    df = _mk_valued(spark, [(0, 0, 5, 1.0)])
    with pytest.raises(ValueError, match="z_crit"):
        GS.rank_sum_shift_cells(df, CELL, 100, z_crit=0.0)
    plan = GS.rank_sum_shift_cells(
        df, CELL, 100
    )._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "BatchEvalPython" not in plan and "CartesianProduct" not in plan


# ------------------------------------------------------ spatial Markov


def _mk_valued_t(spark, rows):
    """(cx, cy, ts_us, value) at cell centers (30-deg lattice)."""
    data = [
        (i, t, cx * CELL + 15.0, cy * CELL + 15.0, float(v))
        for i, (cx, cy, t, v) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data, "event_id bigint, ts_us bigint, lon double, lat double, "
        "value double")


def test_spatial_markov_brute(spark):
    SPLIT = 1000
    # a 3x3 block of cells with known before/after means
    before = {(x, y): 10.0 * (x + 1) + y for x in range(3)
              for y in range(-1, 2)}
    after = dict(before)
    after[(0, 0)] = 99.0   # a poor cell jumps to the top class
    rows = []
    for (x, y), v in before.items():
        rows.append((x, y, 10, v))
    for (x, y), v in after.items():
        rows.append((x, y, SPLIT + 10, v))
    out = [tuple(r) for r in GS.spatial_markov(
        _mk_valued_t(spark, rows), CELL, LAT0, LAT1, split_us=SPLIT
    ).collect()]

    # brute replay: exact integer means (values are exact to 1e-2),
    # rank classes floor(3*(r-1)/9), lag = mean of 8-neighbour means
    def classes(vals):
        ord_ = sorted(vals, key=lambda c: (round(vals[c] * 100),
                                           c[0], c[1]))
        n = len(ord_)
        return {c: (3 * i) // n for i, c in enumerate(ord_)}

    cf, ct = classes(before), classes(after)
    lagv = {}
    for c in before:
        nb = [round(before[(c[0] + dx, c[1] + dy)] * 100)
              for dx in (-1, 0, 1) for dy in (-1, 0, 1)
              if (dx, dy) != (0, 0)
              and (c[0] + dx, c[1] + dy) in before]
        lagv[c] = sum(nb) / len(nb)
    lorder = sorted(lagv, key=lambda c: (lagv[c], c[0], c[1]))
    lc = {c: (3 * i) // len(lorder) for i, c in enumerate(lorder)}
    from collections import Counter

    tri = Counter((lc[c], cf[c], ct[c]) for c in before)
    expect = []
    for (l, a, b), n in tri.items():
        tot = sum(v for (l2, a2, _), v in tri.items()
                  if l2 == l and a2 == a)
        expect.append((l, a, b, n, round(n / tot, 6)))
    assert sorted(out) == sorted(expect)
    # the upgraded cell: from class 0 to class 2
    assert any(l == lc[(0, 0)] and a == 0 and b == 2 for l, a, b, _, _
               in [(r[0], r[1], r[2], r[3], r[4]) for r in out])


def test_spatial_markov_validation(spark):
    df = _mk_valued_t(spark, [(0, 0, 10, 1.0)])
    with pytest.raises(ValueError, match="k_classes"):
        GS.spatial_markov(df, CELL, LAT0, LAT1, 100, k_classes=1)
    with pytest.raises(ValueError, match="k_classes"):
        GS.spatial_markov(df, CELL, LAT0, LAT1, 100, k_classes=6)


# ------------------------------------------------------- field Gi*


def test_hotspot_gi_field_brute(spark):
    # present cells incl. a seam-adjacent pair (cx 11 and 0); two
    # points in one cell exercise the half-up mean
    rows = [(0, 0, 9.0), (1, 0, 8.5), (11, 0, 9.2), (5, 1, 1.0),
            (5, -1, 1.2), (6, 1, 1.1), (0, 1, 8.8)]
    pts = [(i, cx * CELL + 15.0, cy * CELL + 15.0, v)
           for i, (cx, cy, v) in enumerate(rows)]
    pts.append((99, 0 * CELL + 16.0, 0 * CELL + 16.0, 9.05))
    df = spark.createDataFrame(
        pts, "event_id bigint, lon double, lat double, value double")
    out = {(r.cell_x, r.cell_y): r for r in GS.hotspot_gi_field(
        df, "value", CELL, LAT0, LAT1).collect()}

    # brute: exact half-up means of quantized values per cell
    from collections import defaultdict

    acc = defaultdict(list)
    for _, lo, la, v in pts:
        acc[(int(lo // CELL) % NX, int(la // CELL))].append(
            round(v * 100))
    x = {c: (2 * sum(vs) + len(vs)) // (2 * len(vs))
         for c, vs in acc.items()}
    n = len(x)
    m1 = sum(x.values())
    m2 = sum(v * v for v in x.values())
    xb, s2 = m1 / n, m2 / n - (m1 / n) ** 2
    import math

    for c, v in x.items():
        nb = [x[((c[0] + dx) % NX, c[1] + dy)]
              for dx in (-1, 0, 1) for dy in (-1, 0, 1)
              if ((c[0] + dx) % NX, c[1] + dy) in x]
        W = len(nb)
        num = sum(nb) - W * xb
        den = math.sqrt(s2) * math.sqrt((n * W - W * W) / (n - 1))
        r = out[c]
        assert r.n_neighbors == W - 1, c
        assert r.cell_value == pytest.approx(round(x[c] / 100, 6))
        assert r.gi_z == pytest.approx(round(num / den, 6), abs=1e-9), c
        lab = "hot" if num / den >= 1.96 else (
            "cold" if num / den <= -1.96 else "none")
        assert r.spot == lab, c
    # the high cluster is hot, the low cluster cold
    assert out[(0, 0)].spot == "hot"
    assert out[(5, 1)].gi_z < 0


# ----------------------------------------------- bivariate local Moran


def test_lisa_bivariate_brute(spark):
    # busy cells (many events) surrounded by high-value neighbors at
    # (0..1, 0); a quiet low-value pocket at (6..7, 1); an isolate
    layout = {
        (0, 0): (6, 9.0), (1, 0): (5, 8.8), (0, 1): (2, 9.2),
        (6, 1): (1, 1.0), (7, 1): (1, 1.2), (6, 0): (2, 1.1),
        (10, -2): (3, 5.0),   # isolated cell
    }
    pts = []
    eid = 0
    for (cx_, cy_), (cnt, v) in layout.items():
        for _ in range(cnt):
            pts.append((eid, cx_ * CELL + 15.0, cy_ * CELL + 15.0, v))
            eid += 1
    df = spark.createDataFrame(
        pts, "event_id bigint, lon double, lat double, value double")
    out = {(r.cell_x, r.cell_y): r for r in GS.lisa_bivariate(
        df, "value", CELL, LAT0, LAT1).collect()}
    assert set(out) == set(layout)

    x = {c: cnt for c, (cnt, _) in layout.items()}
    y = {c: round(v * 100) for c, (_, v) in layout.items()}
    n = len(layout)
    mx, my = sum(x.values()) / n, sum(y.values()) / n
    denx = sum(v * v for v in x.values()) - n * mx * mx
    deny = sum(v * v for v in y.values()) - n * my * my
    import math

    for c in layout:
        nb = [y[((c[0] + dx) % NX, c[1] + dy)]
              for dx in (-1, 0, 1) for dy in (-1, 0, 1)
              if (dx, dy) != (0, 0)
              and ((c[0] + dx) % NX, c[1] + dy) in layout]
        lag = sum(nb) - len(nb) * my
        dev = x[c] - mx
        ib = n * dev * lag / math.sqrt(denx * deny)
        r = out[c]
        assert r.n_neighbors == len(nb), c
        assert r.ib_i == pytest.approx(round(ib, 6), abs=1e-9), c
        quad = ("HH" if dev >= 0 and lag >= 0 else
                "LL" if dev < 0 and lag < 0 else
                "HL" if dev >= 0 else "LH")
        assert r.quadrant == quad, c
    assert out[(0, 0)].quadrant == "HH"     # busy in a rich hood
    assert out[(6, 1)].quadrant == "LL"     # quiet in a poor hood
    assert out[(10, -2)].n_neighbors == 0   # isolate: lag 0


# ------------------------------------------- EB-standardized Moran


def test_eb_moran_brute(spark):
    # clustered high-rate cells (0..1, 0) vs low-rate elsewhere; one
    # tiny-base noisy cell that raw-rate Moran would overweight
    layout = {
        (0, 0): (8, 10), (1, 0): (7, 10), (0, 1): (6, 9),
        (5, 0): (0, 10), (6, 0): (1, 12), (5, 1): (0, 8),
        (9, -1): (1, 2),   # 50% rate from base 2 -> strongly shrunk z
    }
    pts, eid = [], 0
    for (cx_, cy_), (cases, base) in layout.items():
        for j in range(base):
            pts.append((eid, "error" if j < cases else "view",
                        cx_ * CELL + 15.0, cy_ * CELL + 15.0))
            eid += 1
    df = spark.createDataFrame(
        pts, "event_id bigint, event_type string, lon double, "
        "lat double")
    r = GS.eb_moran(df, "event_type", "'error'", CELL, LAT0, LAT1
                    ).collect()[0]

    import math

    X = sum(c for c, _ in layout.values())
    T = sum(b for _, b in layout.values())
    K = len(layout)
    b = X / T
    s2m = sum(t * (x / t - b) ** 2 for x, t in layout.values()) / T
    a = max(0.0, s2m - b * K / T)
    z = {c: (x / t - b) / math.sqrt(a + b / t)
         for c, (x, t) in layout.items()}
    n = len(z)
    nbrs = {c: [z[((c[0] + dx) % NX, c[1] + dy)]
                for dx in (-1, 0, 1) for dy in (-1, 0, 1)
                if (dx, dy) != (0, 0)
                and ((c[0] + dx) % NX, c[1] + dy) in z]
            for c in z}
    W = sum(len(v) for v in nbrs.values())
    m = sum(z.values()) / n
    m2c = sum(v * v for v in z.values()) - n * m * m
    num = sum((z[c] - m) * sum(nbrs[c]) for c in z) \
        - m * sum(len(nbrs[c]) for c in z) * 0  # expand below
    num = (sum(z[c] * sum(nbrs[c]) for c in z)
           - 2 * m * sum(len(nbrs[c]) * z[c] for c in z)
           + m * m * W)
    I = (n / W) * num / m2c
    assert r.n_cells == n and r.w_sum == W
    assert r.morans_i == pytest.approx(round(I, 6), abs=1e-9)
    assert r.morans_i > 0  # clustered rate surface
    assert r.e_i == pytest.approx(round(-1 / (n - 1), 6))
    # moments/variance: reuse the house algebra
    m4c = (sum(v ** 4 for v in z.values())
           - 4 * m * sum(v ** 3 for v in z.values())
           + 6 * m * m * sum(v * v for v in z.values())
           - 3 * n * m ** 4)
    b2 = n * m4c / (m2c * m2c)
    S1 = 2 * W
    S2 = sum((2 * len(nbrs[c])) ** 2 for c in z)
    A = (n * n - 3 * n + 3) * S1 - n * S2 + 3 * W * W
    B = (n * n - n) * S1 - 2 * n * S2 + 6 * W * W
    den = (n - 1) * (n - 2) * (n - 3) * W * W
    e = -1 / (n - 1)
    var = (n * A - b2 * B) / den - e * e
    assert r.var_i == pytest.approx(round(var, 6), abs=1e-9)


# -------------------------------------------- seasonal decomposition


def test_seasonal_decompose_brute(spark):
    T, P = 15, 5
    h = (P - 1) // 2
    base = [3, 9, 15, 9, 3]  # pure P-periodic signal
    series = {
        (0, 0): [base[b % P] for b in range(T)],         # resid ~ 0
        (3, 1): [base[b % P] + b for b in range(T)],     # + linear trend
        (5, -1): [2, 0, 0, 7, 0, 1, 0, 0, 3, 0, 0, 0, 5, 0, 0],
    }
    cells = [
        (cx, cy, b, c)
        for (cx, cy), xs in series.items()
        for b, c in enumerate(xs) if c > 0
    ]
    out = {}
    for r in GS.seasonal_decompose(
            _mk_events_t(spark, cells), CELL, t0_us=0, bin_us=1000,
            n_bins=T, period=P).collect():
        out[(r.cell_x, r.cell_y, r.b)] = r
    for key, xs in series.items():
        trend = [None] * T
        for b in range(h, T - h):
            trend[b] = sum(xs[b - h:b + h + 1]) / P
        sraw = {}
        for ph in range(P):
            vals = [xs[b] - trend[b] for b in range(T)
                    if trend[b] is not None and b % P == ph]
            sraw[ph] = sum(vals) / len(vals)
        mean_s = sum(sraw.values()) / P
        seas = {ph: sraw[ph] - mean_s for ph in range(P)}
        for b in range(T):
            r = out[(key[0], key[1], b)]
            assert r.x == xs[b], (key, b)
            if trend[b] is None:
                assert r.trend is None and r.resid is None
            else:
                assert r.trend == pytest.approx(
                    round(trend[b], 6), abs=1e-9), (key, b)
                assert r.resid == pytest.approx(
                    round(xs[b] - trend[b] - seas[b % P], 6),
                    abs=1e-6), (key, b)
            assert r.seasonal == pytest.approx(
                round(seas[b % P], 6), abs=1e-9), (key, b)
    # the pure-periodic cell decomposes with ~zero residuals
    for b in range(h, T - h):
        assert abs(out[(0, 0, b)].resid) < 1e-6
    with pytest.raises(ValueError, match="odd"):
        GS.seasonal_decompose(
            _mk_events_t(spark, cells), CELL, 0, 1000, 12, 4)
    with pytest.raises(ValueError, match="whole"):
        GS.seasonal_decompose(
            _mk_events_t(spark, cells), CELL, 0, 1000, 10, 7)


# ------------------------------------------------- teleconnection map


def test_teleconnection_brute(spark):
    T, L = 12, 2
    ref = [5, 9, 2, 7, 1, 8, 3, 9, 4, 6, 2, 7]  # busiest cell
    series = {
        (0, 0): ref,
        (3, 1): ref[1:] + [0],            # leads ref by 1 -> best lag -1
        (5, -1): [0, 0] + ref[:-2],       # trails by 2 -> best lag +2
        (7, 2): [1] * T,                  # constant -> NULL r
    }
    cells = [
        (cx, cy, b, c)
        for (cx, cy), xs in series.items()
        for b, c in enumerate(xs) if c > 0
    ]
    rows = GS.teleconnection(
        _mk_events_t(spark, cells), CELL, t0_us=0, bin_us=1000,
        n_bins=T, max_lag=L).collect()
    out = {(r.cell_x, r.cell_y, r.lag): r for r in rows}
    best = {(r.cell_x, r.cell_y): (r.best_lag, r.best_r) for r in rows}
    import math

    def corr(xs, ys):
        pairs = [(x, y) for x, y in zip(xs, ys)]
        n = len(pairs)
        sx = sum(x for x, _ in pairs); sy = sum(y for _, y in pairs)
        sxx = sum(x * x for x, _ in pairs)
        syy = sum(y * y for _, y in pairs)
        sxy = sum(x * y for x, y in pairs)
        dx = n * sxx - sx * sx; dy = n * syy - sy * sy
        if dx <= 0 or dy <= 0:
            return None
        return round((n * sxy - sx * sy) / math.sqrt(dx * dy), 6)

    for key, xs in series.items():
        for k in range(-L, L + 1):
            # overlap: x[b] vs ref[b-k]
            pairs_x = [xs[b] for b in range(T) if 0 <= b - k < T]
            pairs_y = [ref[b - k] for b in range(T) if 0 <= b - k < T]
            r = out[(key[0], key[1], k)]
            assert r.n_overlap == len(pairs_x), (key, k)
            expect = corr(pairs_x, pairs_y)
            if expect is None:
                assert r.r is None, (key, k)
            else:
                assert r.r == pytest.approx(expect, abs=1e-9), (key, k)
    assert best[(0, 0)] == (0, 1.0)
    assert best[(3, 1)][0] == -1
    assert best[(5, -1)][0] == 2
    assert best[(7, 2)][1] is None or abs(best[(7, 2)][1]) < 1
    with pytest.raises(ValueError, match="max_lag"):
        GS.teleconnection(
            _mk_events_t(spark, cells), CELL, 0, 1000, T, max_lag=6)


# --------------------- permutation / Monte-Carlo inference (r5) --


def _hash01(i, tag):
    """Deterministic fixture uniform (hashlib — test-only; the operators
    themselves use in-plan md5)."""
    import hashlib

    return (
        int(hashlib.md5(f"{tag}:{i}".encode()).hexdigest()[:8], 16) / 2**32
    )


def _csr_events(spark, n=500, tag="c"):
    rows = [
        (
            _hash01(i, tag + "lo") * 360.0 - 180.0,
            _hash01(i, tag + "la") * 120.0 - 60.0,
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "lon double, lat double")


def _planted_events(spark, n_bg=200, n_blob=300):
    rows = [
        (10.0 + _hash01(i, "px") * 8.0, 10.0 + _hash01(i, "py") * 8.0)
        for i in range(n_blob)
    ]
    rows += [
        (
            _hash01(i, "blo") * 360.0 - 180.0,
            _hash01(i, "bla") * 120.0 - 60.0,
        )
        for i in range(n_bg)
    ]
    return spark.createDataFrame(rows, "lon double, lat double")


def test_morans_i_p_planted_cluster_significant(spark):
    out = GS.morans_i_p(
        _planted_events(spark), cell_deg=5.0, lat0=-65.0, lat1=65.0,
        n_reps=99,
    ).collect()[0]
    assert out["morans_i"] > 0.1
    assert out["p_sim"] <= 0.01  # minimum attainable at 99 reps
    assert out["n_ge"] == 0


def test_morans_i_p_csr_not_significant(spark):
    # a hash-uniform field should not reject at the 5% level for the
    # upper (clustering) tail across several independent fixtures
    ps = []
    for tag in ("a", "b", "c"):
        out = GS.morans_i_p(
            _csr_events(spark, 500, tag), cell_deg=5.0, lat0=-65.0,
            lat1=65.0, n_reps=99, seed="s" + tag,
        ).collect()[0]
        ps.append(out["p_upper"])
    assert min(ps) > 0.05


def test_morans_i_p_matches_morans_i_statistic(spark):
    """The observed statistic in the _p twin must equal morans_i's."""
    ev = _planted_events(spark)
    a = GS.morans_i(ev, cell_deg=5.0, lat0=-65.0, lat1=65.0).collect()[0]
    b = GS.morans_i_p(
        ev, cell_deg=5.0, lat0=-65.0, lat1=65.0, n_reps=9
    ).collect()[0]
    assert b["morans_i"] == pytest.approx(a["morans_i"], abs=1e-9)
    assert b["n_cells"] == a["n_cells"] and b["w_sum"] == a["w_sum"]


def test_lisa_p_planted_blob_cells_significant(spark):
    ev = _planted_events(spark)
    rows = GS.local_morans_i_p(
        ev, cell_deg=5.0, lat0=-65.0, lat1=65.0, n_reps=99
    ).collect()
    base = {
        (r["cell_x"], r["cell_y"]): r
        for r in GS.local_morans_i(
            ev, cell_deg=5.0, lat0=-65.0, lat1=65.0
        ).collect()
    }
    # same cell set and identical statistic values as the plain LISA
    assert {(r["cell_x"], r["cell_y"]) for r in rows} == set(base)
    hot = [r for r in rows if r["cnt"] >= 50]
    assert hot, "planted blob must materialize high-count cells"
    for r in hot:
        b = base[(r["cell_x"], r["cell_y"])]
        assert r["lisa_i"] == pytest.approx(b["lisa_i"], abs=1e-9)
        assert r["quadrant"] == b["quadrant"] == "HH"
        assert r["p_sim"] <= 0.01


def test_lisa_p_csr_nominal_rate(spark):
    rows = GS.local_morans_i_p(
        _csr_events(spark, 500, "z"), cell_deg=5.0, lat0=-65.0,
        lat1=65.0, n_reps=99,
    ).collect()
    frac_sig = sum(1 for r in rows if r["p_sim"] <= 0.05) / len(rows)
    # nominal 5% with multiple-testing noise; a clustered field gives
    # 10x this (the planted test's blob cells alone exceed it)
    assert frac_sig < 0.12
    # replication bookkeeping: tails must tally every replication
    for r in rows[:50]:
        assert r["n_ge"] + r["n_le"] >= 99


T0_US = 1_704_067_200_000_000
BIN_US = 172_800_000_000


def _st_events(spark, planted: bool):
    rows = [
        (
            _hash01(i, "lo") * 360.0 - 180.0,
            _hash01(i, "la") * 120.0 - 60.0,
            T0_US + int(_hash01(i, "t") * 15 * BIN_US),
        )
        for i in range(2000)
    ]
    if planted:
        rows += [
            (
                20.0 + _hash01(i, "px") * 30.0,
                10.0 + _hash01(i, "py") * 20.0,
                T0_US + int((6.0 + 2.0 * _hash01(i, "pt")) * BIN_US),
            )
            for i in range(120)
        ]
    return spark.createDataFrame(rows, "lon double, lat double, ts_us bigint")


def test_spacetime_scan_p_planted_cylinder_significant(spark):
    out = GS.spacetime_scan_p(
        _st_events(spark, True), cell_deg=15.0, lat0=-60.0, lat1=60.0,
        t0_us=T0_US, bin_us=BIN_US, n_bins=15, w_max=2, n_reps=99,
    ).collect()[0]
    assert out["max_llr"] > 20.0
    assert out["p_value"] <= 0.01
    assert out["n_events"] == 2120


def test_spacetime_scan_p_csr_not_significant(spark):
    out = GS.spacetime_scan_p(
        _st_events(spark, False), cell_deg=15.0, lat0=-60.0, lat1=60.0,
        t0_us=T0_US, bin_us=BIN_US, n_bins=15, w_max=2, n_reps=99,
    ).collect()[0]
    assert out["p_value"] > 0.1


def test_spacetime_scan_p_matches_scan_max_llr(spark):
    """The r=0 path must reproduce spacetime_scan's max cylinder LLR."""
    ev = _st_events(spark, True)
    cyl = GS.spacetime_scan(
        ev, cell_deg=15.0, lat0=-60.0, lat1=60.0, t0_us=T0_US,
        bin_us=BIN_US, n_bins=15, w_max=2, min_count=3, llr_min=0.0,
    ).agg({"llr": "max"}).collect()[0][0]
    out = GS.spacetime_scan_p(
        ev, cell_deg=15.0, lat0=-60.0, lat1=60.0, t0_us=T0_US,
        bin_us=BIN_US, n_bins=15, w_max=2, n_reps=9,
    ).collect()[0]
    assert out["max_llr"] == pytest.approx(cyl, abs=2e-6)


def test_perm_inference_param_validation():
    with pytest.raises(ValueError, match="n_reps"):
        GS.morans_i_p_sql("SELECT 1", 5.0, -65.0, 65.0, n_reps=0)
    with pytest.raises(ValueError, match="mu_split"):
        GS.spacetime_scan_p_sql(
            "SELECT 1", 15.0, -60.0, 60.0, T0_US, BIN_US, 15,
            mu_split=0.5,
        )
    with pytest.raises(ValueError, match="k_max"):
        GS.spacetime_scan_p_sql(
            "SELECT 1", 15.0, -60.0, 60.0, T0_US, BIN_US, 15, k_max=4,
        )


def test_global_autocorr_p_matches_individual_statistics(spark):
    """The combined operator's three statistics must equal the engine's
    standalone morans_i / gearys_c / general_g on the same field."""
    ev = _planted_events(spark)
    out = GS.global_autocorr_p(
        ev, cell_deg=5.0, lat0=-65.0, lat1=65.0, n_reps=9
    ).collect()[0]
    mi = GS.morans_i(ev, cell_deg=5.0, lat0=-65.0, lat1=65.0).collect()[0]
    gc = GS.gearys_c(ev, cell_deg=5.0, lat0=-65.0, lat1=65.0).collect()[0]
    gg = GS.general_g(ev, cell_deg=5.0, lat0=-65.0, lat1=65.0).collect()[0]
    assert out["morans_i"] == pytest.approx(mi["morans_i"], abs=1e-9)
    assert out["gearys_c"] == pytest.approx(gc["gearys_c"], abs=1e-9)
    assert out["general_g"] == pytest.approx(gg["general_g"], abs=1e-9)


def test_global_autocorr_p_planted_vs_csr(spark):
    hot = GS.global_autocorr_p(
        _planted_events(spark), cell_deg=5.0, lat0=-65.0, lat1=65.0,
        n_reps=99,
    ).collect()[0]
    # a planted blob clusters on all three: I high, C < 1, G high
    assert hot["p_moran"] <= 0.01
    assert hot["gearys_c"] < 1.0 and hot["p_geary"] <= 0.01
    assert hot["p_g"] <= 0.01
    csr = GS.global_autocorr_p(
        _csr_events(spark, 500, "q"), cell_deg=5.0, lat0=-65.0,
        lat1=65.0, n_reps=99,
    ).collect()[0]
    assert min(csr["p_moran"], csr["p_geary"], csr["p_g"]) > 0.02


def _st2_events(spark):
    """CSR background + TWO disjoint planted space-time clusters."""
    rows = [
        (
            _hash01(i, "lo") * 360.0 - 180.0,
            _hash01(i, "la") * 120.0 - 60.0,
            T0_US + int(_hash01(i, "t") * 15 * BIN_US),
        )
        for i in range(2000)
    ]
    rows += [
        (20.0 + _hash01(i, "px") * 30.0, 10.0 + _hash01(i, "py") * 20.0,
         T0_US + int((6.0 + 2.0 * _hash01(i, "pt")) * BIN_US))
        for i in range(120)
    ]
    rows += [
        (-120.0 + _hash01(i, "qx") * 30.0,
         -40.0 + _hash01(i, "qy") * 20.0,
         T0_US + int((11.0 + 2.0 * _hash01(i, "qt")) * BIN_US))
        for i in range(60)
    ]
    return spark.createDataFrame(rows, "lon double, lat double, ts_us bigint")


def test_spacetime_scan_top_recovers_both_planted_clusters(spark):
    out = {r["rank_no"]: r for r in GS.spacetime_scan_top(
        _st2_events(spark), cell_deg=15.0, lat0=-60.0, lat1=60.0,
        t0_us=T0_US, bin_us=BIN_US, n_bins=15, w_max=2, n_reps=99, k=3,
    ).collect()}
    # primary = the strong cluster (bins 6-7), secondary = the weaker
    # one (bins 11-12); both significant, the noise rank-3 is not
    assert out[1]["t_start"] == 6 and out[1]["p_value"] <= 0.01
    assert out[2]["t_start"] == 11 and out[2]["p_value"] <= 0.01
    assert out[3]["llr"] < out[2]["llr"] < out[1]["llr"]
    assert out[3]["p_value"] > 0.1
    # non-overlap invariant: 3x3 bases disjoint OR bin windows disjoint
    nx = 24
    for a in (1, 2):
        for b in range(a + 1, 4):
            ra, rb = out[a], out[b]
            dcx = min((ra["cx"] - rb["cx"]) % nx, (rb["cx"] - ra["cx"]) % nx)
            spatial = dcx <= 2 and abs(ra["cy"] - rb["cy"]) <= 2
            temporal = (ra["t_start"] < rb["t_start"] + rb["w_bins"]
                        and rb["t_start"] < ra["t_start"] + ra["w_bins"])
            assert not (spatial and temporal)


def test_spacetime_scan_top_primary_matches_scan_p(spark):
    ev = _st_events(spark, True)
    top = GS.spacetime_scan_top(
        ev, cell_deg=15.0, lat0=-60.0, lat1=60.0, t0_us=T0_US,
        bin_us=BIN_US, n_bins=15, w_max=2, n_reps=19, k=2,
    ).collect()
    p = GS.spacetime_scan_p(
        ev, cell_deg=15.0, lat0=-60.0, lat1=60.0, t0_us=T0_US,
        bin_us=BIN_US, n_bins=15, w_max=2, n_reps=19,
    ).collect()[0]
    primary = [r for r in top if r["rank_no"] == 1][0]
    assert primary["llr"] == pytest.approx(p["max_llr"], abs=2e-6)
    assert primary["p_value"] == pytest.approx(p["p_value"], abs=1e-9)


def _multi_blob_events(spark):
    """Four separated dense blobs + background: enough floor-p cells
    for the BH step-up to clear the discrete pseudo-p floor."""
    rows = []
    for bi, (lx, ly) in enumerate([(10.0, 10.0), (-120.0, -40.0),
                                   (60.0, 40.0), (-60.0, 20.0)]):
        rows += [
            (lx + _hash01(i, f"bx{bi}") * 12.0,
             ly + _hash01(i, f"by{bi}") * 12.0)
            for i in range(250)
        ]
    rows += [
        (_hash01(i, "mlo") * 360.0 - 180.0,
         _hash01(i, "mla") * 120.0 - 60.0)
        for i in range(300)
    ]
    return spark.createDataFrame(rows, "lon double, lat double")


def test_lisa_p_fdr_planted_and_stepup_invariants(spark):
    """BH over pseudo-p is conservative by construction: the rejection
    floor is the rank where i*q/m clears 1/(n_reps+1), so the fixture
    plants FOUR blobs (enough floor-p cells) and runs 999 reps."""
    ev = _multi_blob_events(spark)
    rows = GS.lisa_p_fdr(
        ev, cell_deg=5.0, lat0=-65.0, lat1=65.0, n_reps=999, q=0.05,
    ).collect()
    m = rows[0]["m_tests"]
    assert m == len(rows)
    sig = [r for r in rows if r["label"] != "not significant"]
    assert sig, "four planted blobs must clear the BH floor at 999 reps"
    # every high-count blob core is FDR-significant HH (the blobs
    # spread ~250 events over ~9 cells -> cores around 40-50)
    hot = [r for r in rows if r["cnt"] >= 40]
    assert hot and all(r["label"] == "HH" for r in hot)
    # BH step-up invariants: rejected set = ranks 1..i_max; the
    # boundary rank satisfies its own threshold
    imax = max(r["p_rank"] for r in sig)
    assert {r["p_rank"] for r in sig} == set(range(1, imax + 1))
    bound = [r for r in rows if r["p_rank"] == imax][0]
    assert bound["p_sim"] <= imax * 0.05 / m
    # significant labels keep their LISA quadrant
    base = {
        (r["cell_x"], r["cell_y"]): r["quadrant"]
        for r in GS.local_morans_i_p(
            ev, cell_deg=5.0, lat0=-65.0, lat1=65.0, n_reps=999,
        ).collect()
    }
    for r in sig:
        assert r["label"] == base[(r["cell_x"], r["cell_y"])]


def test_lisa_p_fdr_csr_rejects_nothing(spark):
    rows = GS.lisa_p_fdr(
        _csr_events(spark, 500, "f"), cell_deg=5.0, lat0=-65.0,
        lat1=65.0, n_reps=199, q=0.05,
    ).collect()
    frac = sum(
        1 for r in rows if r["label"] != "not significant"
    ) / len(rows)
    # FDR on a null field admits essentially nothing (vs the raw 5%
    # cut's ~5% false clusters)
    assert frac < 0.01


def test_spacetime_scan_prospective_only_active_clusters(spark):
    """SaTScan's prospective surveillance mode: only cylinders whose
    window ends at the LATEST bin are scanned — a historical (mid-
    series) cluster must NOT alert, an active (end-of-series) one
    must."""
    rows = [
        (
            _hash01(i, "lo") * 360.0 - 180.0,
            _hash01(i, "la") * 120.0 - 60.0,
            T0_US + int(_hash01(i, "t") * 15 * BIN_US),
        )
        for i in range(2000)
    ]
    # historical cluster: bins 5-6; active cluster: bins 13-14 (ending
    # at n_bins=15)
    rows += [
        (20.0 + _hash01(i, "px") * 30.0, 10.0 + _hash01(i, "py") * 20.0,
         T0_US + int((5.0 + 2.0 * _hash01(i, "pt")) * BIN_US))
        for i in range(120)
    ]
    rows += [
        (-120.0 + _hash01(i, "qx") * 30.0,
         -40.0 + _hash01(i, "qy") * 20.0,
         T0_US + int((13.0 + 2.0 * _hash01(i, "qt")) * BIN_US))
        for i in range(120)
    ]
    ev = spark.createDataFrame(rows, "lon double, lat double, ts_us bigint")
    kw = dict(cell_deg=15.0, lat0=-60.0, lat1=60.0, t0_us=T0_US,
              bin_us=BIN_US, n_bins=15, w_max=2, min_count=3)
    prosp = GS.spacetime_scan(ev, llr_min=10.0, prospective=True, **kw)
    rows_p = prosp.collect()
    # every prospective cylinder ends at the last bin
    assert rows_p and all(
        r["t_start"] + r["w_bins"] == 15 for r in rows_p
    )
    # the active cluster alerts, the historical one is invisible
    assert any(r["t_start"] == 13 for r in rows_p)
    retro = GS.spacetime_scan(ev, llr_min=10.0, **kw).collect()
    assert any(r["t_start"] == 5 for r in retro)
    assert not any(r["t_start"] == 5 for r in rows_p)
    # prospective Monte-Carlo p: the active cluster is significant
    # against the prospective null (max over ACTIVE cylinders only)
    p = GS.spacetime_scan_p(
        ev, n_reps=99, prospective=True, **kw
    ).collect()[0]
    assert p["p_value"] <= 0.01 and p["max_llr"] > 20.0


def test_temporal_scan_p_burst_vs_uniform(spark):
    uni = [
        (0.0, 0.0, T0_US + int(_hash01(i, "t") * 15 * BIN_US))
        for i in range(3000)
    ]
    burst = uni + [
        (0.0, 0.0, T0_US + int((8.0 + 2.0 * _hash01(i, "b")) * BIN_US))
        for i in range(600)
    ]
    dfb = spark.createDataFrame(
        burst, "lon double, lat double, ts_us bigint"
    )
    out = GS.temporal_scan_p(
        dfb, T0_US, BIN_US, 15, w_max=4, n_reps=99
    ).collect()[0]
    # the planted burst window is found exactly and is significant
    assert (out["t_start"], out["w_bins"]) == (8, 2)
    assert out["obs"] > out["expected"]
    assert out["p_value"] <= 0.01
    dfu = spark.createDataFrame(uni, "lon double, lat double, ts_us bigint")
    outu = GS.temporal_scan_p(
        dfu, T0_US, BIN_US, 15, w_max=4, n_reps=99
    ).collect()[0]
    assert outu["p_value"] > 0.1
    # the SPACE-TIME permutation scan conditions the burst away — the
    # complementarity this operator exists for: same burst corpus,
    # spread over space, max LLR stays noise-level
    spread = [
        (
            _hash01(i, "lo") * 360.0 - 180.0,
            _hash01(i, "la") * 100.0 - 50.0,
            t,
        )
        for i, (_, _, t) in enumerate(burst)
    ]
    dfs = spark.createDataFrame(
        spread, "lon double, lat double, ts_us bigint"
    )
    st = GS.spacetime_scan_p(
        dfs, cell_deg=15.0, lat0=-60.0, lat1=60.0, t0_us=T0_US,
        bin_us=BIN_US, n_bins=15, w_max=2, n_reps=99,
    ).collect()[0]
    assert st["p_value"] > 0.05


def test_temporal_scan_p_prospective(spark):
    rows = [
        (0.0, 0.0, T0_US + int(_hash01(i, "t") * 15 * BIN_US))
        for i in range(3000)
    ]
    rows += [
        (0.0, 0.0, T0_US + int((7.0 + 1.0 * _hash01(i, "b")) * BIN_US))
        for i in range(600)
    ]
    df = spark.createDataFrame(rows, "lon double, lat double, ts_us bigint")
    out = GS.temporal_scan_p(
        df, T0_US, BIN_US, 15, w_max=4, n_reps=99, prospective=True
    ).collect()[0]
    # surveillance mode: the mid-series burst (bin 7) is historical —
    # only windows ending at bin 15 are scored, none significant
    assert out["t_start"] + out["w_bins"] == 15
    assert out["p_value"] > 0.1
