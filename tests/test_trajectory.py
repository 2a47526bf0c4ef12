"""track_stats: NumPy-truth geodesic lengths, deterministic tie-break
ordering, degenerate single-point tracks, and the one-exchange plan."""

import numpy as np
import pytest

from ocgis_spark.operators import trajectory

R = 6370997.0  # reference Spherical radius (src/ocgis/variable/crs.py:803)


def _hav(lon1, lat1, lon2, lat2):
    p = np.pi / 180.0
    s1 = np.sin((lat2 - lat1) * p / 2.0)
    s2 = np.sin((lon2 - lon1) * p / 2.0)
    h = s1 * s1 + np.cos(lat1 * p) * np.cos(lat2 * p) * s2 * s2
    return 2.0 * R * np.arcsin(np.sqrt(min(1.0, h)))


def test_track_stats_numpy_truth_and_plan(spark):
    # user 1: a 4-point walk; user 2: single point; user 3: two points
    # with EQUAL timestamps (event_id tie-break decides the walk order)
    rows = [
        (10, 1, 1_000_000, -105.0, 38.0),
        (11, 1, 2_000_000, -104.8, 38.1),
        (12, 1, 3_000_000, -104.9, 38.3),
        (13, 1, 4_000_000, -105.2, 38.2),
        (20, 2, 5_000_000, 10.0, 50.0),
        (31, 3, 7_000_000, 0.0, 0.0),
        (30, 3, 7_000_000, 0.5, 0.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts_us bigint, "
              "lon double, lat double"
    )
    out = {r.user_id: r for r in trajectory.track_stats(df).collect()}

    pts1 = [(-105.0, 38.0), (-104.8, 38.1), (-104.9, 38.3), (-105.2, 38.2)]
    steps1 = [_hav(*pts1[i], *pts1[i + 1]) for i in range(3)]
    assert out[1].n_points == 4
    assert out[1].length_m == pytest.approx(sum(steps1), abs=2e-3)
    assert out[1].max_step_m == pytest.approx(max(steps1), abs=2e-3)
    assert out[1].net_m == pytest.approx(_hav(*pts1[0], *pts1[-1]), abs=2e-3)
    assert out[1].duration_us == 3_000_000

    # single point: zero everything
    assert (out[2].n_points, out[2].length_m, out[2].net_m,
            out[2].max_step_m, out[2].duration_us) == (1, 0.0, 0.0, 0.0, 0)

    # timestamp tie: event_id 30 sorts before 31, so the walk is
    # (0.5, 0) -> (0, 0); net == length == that one step
    step3 = _hav(0.5, 0.0, 0.0, 0.0)
    assert out[3].length_m == pytest.approx(step3, abs=2e-3)
    assert out[3].net_m == out[3].length_m
    # and the result is invariant under input row order
    out_rev = {
        r.user_id: r
        for r in trajectory.track_stats(
            spark.createDataFrame(
                rows[::-1], "event_id bigint, user_id bigint, "
                            "ts_us bigint, lon double, lat double"
            )
        ).collect()
    }
    assert out_rev == out

    plan = (
        trajectory.track_stats(df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # window + groupBy share hashpartitioning(user_id): ONE exchange
    assert plan.count("Exchange hashpartitioning") == 1


# ---- route proximity ----

def _to_xyz(lon, lat):
    lo, la = np.radians(lon), np.radians(lat)
    return np.array(
        [np.cos(la) * np.cos(lo), np.cos(la) * np.sin(lo), np.sin(la)])


def _ang(u, v):
    return np.arctan2(np.linalg.norm(np.cross(u, v)), np.dot(u, v))


def _seg_dist_ref(p, a, b):
    """Independent 3D-vector truth: foot of p on the great circle; on
    the arc -> cross-track angle, else nearest endpoint."""
    n = np.cross(a, b)
    n = n / np.linalg.norm(n)
    c = p - np.dot(n, p) * n
    nc = np.linalg.norm(c)
    if nc > 1e-12:
        c = c / nc
        if _ang(a, c) + _ang(c, b) <= _ang(a, b) + 1e-12:
            return abs(np.arcsin(np.clip(np.dot(n, p), -1, 1))) * R
    return min(_ang(a, p), _ang(b, p)) * R


def _route_dist_ref(lon, lat, route):
    p = _to_xyz(lon, lat)
    pts = [_to_xyz(x, y) for x, y in route]
    return min(_seg_dist_ref(p, a, b) for a, b in zip(pts, pts[1:]))


def test_route_distance_matches_vector_truth(spark):
    """Engine expression vs the 3D-vector reference, including a
    seam-crossing route, a polar route, and near-antipodal points (the
    case where the textbook behind-p1 clamp is wrong)."""
    routes = [
        [(-104.2, 38.1), (-98.0, 41.5), (-90.0, 35.0)],
        [(175.0, -10.0), (-178.0, 5.0), (-170.0, 20.0)],   # seam
        [(0.0, 80.0), (90.0, 80.0)],                       # polar
    ]
    rng = np.random.default_rng(23)
    pts = [(float(lo), float(la)) for lo, la in zip(
        rng.uniform(-180, 180, 40), rng.uniform(-89, 89, 40))]
    # planted near-antipodal probes for the polar route
    pts += [(45.58, -68.94), (58.48, -65.20), (-150.75, -65.74)]
    df = spark.createDataFrame(pts, "lon double, lat double")
    for route in routes:
        out = df.selectExpr(
            "lon", "lat",
            f"{trajectory.route_distance_sql(route)} AS d")
        for r in out.collect():
            want = _route_dist_ref(r["lon"], r["lat"], route)
            assert abs(r["d"] - want) <= max(1e-3, 1e-9 * want), (
                route[0], r["lon"], r["lat"], r["d"], want)


def test_route_proximity_filter_and_plan(spark):
    route = [(0.0, 0.0), (10.0, 0.0)]
    pts = [(5.0, 0.5), (5.0, 3.0), (-1.0, 0.0), (20.0, 0.0)]
    df = spark.createDataFrame(pts, "lon double, lat double")
    out = trajectory.route_proximity(df, route, max_dist_m=200_000.0)
    rows = out.collect()
    # 0.5 deg abeam (~55.6 km) and 1 deg past an endpoint (~111 km) stay;
    # 3 deg abeam (~334 km) and 10 deg past (~1112 km) are cut
    assert sorted((r["lon"], r["lat"]) for r in rows) == [
        (-1.0, 0.0), (5.0, 0.5)]
    for r in rows:
        want = _route_dist_ref(r["lon"], r["lat"], route)
        assert abs(r["route_dist_m"] - want) < 1e-3
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def _seg_locate_ref(p, a, b):
    """(distance_m, clamped along-arc position_m) — 3D-vector truth with
    the SAME branch rule as the engine (off-arc snaps to the endpoint
    the min picks)."""
    n = np.cross(a, b)
    n = n / np.linalg.norm(n)
    c = p - np.dot(n, p) * n
    nc = np.linalg.norm(c)
    if nc > 1e-12:
        c = c / nc
        if _ang(a, c) + _ang(c, b) <= _ang(a, b) + 1e-12:
            return abs(np.arcsin(np.clip(np.dot(n, p), -1, 1))) * R, \
                _ang(a, c) * R
    da, db = _ang(a, p), _ang(b, p)
    if da <= db:
        return da * R, 0.0
    return db * R, _ang(a, b) * R


def _route_locate_ref(lon, lat, route):
    p = _to_xyz(lon, lat)
    pts = [_to_xyz(x, y) for x, y in route]
    best = None
    off = 0.0
    for i, (a, b) in enumerate(zip(pts, pts[1:])):
        d, pos = _seg_locate_ref(p, a, b)
        # first-min tie-break, matching the engine's CASE order
        if best is None or d < best[0] - 1e-9:
            best = (d, i, off + pos)
        off += _ang(a, b) * R
    return best


def test_route_locate_matches_vector_truth(spark):
    """Engine (dist, seg, chainage) vs the 3D-vector reference over the
    seam-crossing corridor route; points whose two best segments are
    within 1 m are skipped for seg/chainage (tie zone — dist itself must
    still match)."""
    route = [(150.0, -20.0), (-170.0, 5.0), (-104.2, 38.1), (-60.0, 10.0)]
    rng = np.random.default_rng(41)
    pts = [(float(lo), float(la)) for lo, la in zip(
        rng.uniform(-180, 180, 60), rng.uniform(-75, 75, 60))]
    df = spark.createDataFrame(pts, "lon double, lat double")
    out = trajectory.route_locate(df, route).collect()
    for r in out:
        d, seg, chain = _route_locate_ref(r["lon"], r["lat"], route)
        assert abs(r["route_dist_m"] - d) <= 1e-3, (r, d)
        # tie zone: two segments nearly equidistant -> seg choice is
        # legitimately either; chainage then differs by design
        pref = [_seg_locate_ref(
            _to_xyz(r["lon"], r["lat"]),
            _to_xyz(*route[i]), _to_xyz(*route[i + 1]))[0]
            for i in range(len(route) - 1)]
        pref.sort()
        if len(pref) > 1 and pref[1] - pref[0] < 1.0:
            continue
        assert r["route_seg"] == seg, (r, seg)
        assert abs(r["route_pos_m"] - chain) <= 1e-2, (r, chain)


def test_route_locate_on_route_monotone_and_vertex_continuity(spark):
    """Points sampled ALONG the route (slerp on each segment) have
    ~zero distance and strictly increasing chainage; at each interior
    vertex both adjacent segments report the SAME chainage (so the
    tie-break cannot move the value)."""
    route = [(-10.0, 0.0), (0.0, 20.0), (15.0, 10.0)]
    pts3 = [_to_xyz(x, y) for x, y in route]
    samples = []
    for a, b in zip(pts3, pts3[1:]):
        w = _ang(a, b)
        for t in np.linspace(0.05, 0.95, 7):
            v = (np.sin((1 - t) * w) * a + np.sin(t * w) * b) / np.sin(w)
            v = v / np.linalg.norm(v)
            samples.append((
                float(np.degrees(np.arctan2(v[1], v[0]))),
                float(np.degrees(np.arcsin(np.clip(v[2], -1, 1)))),
            ))
    df = spark.createDataFrame(samples, "lon double, lat double")
    rows = trajectory.route_locate(df, route).collect()
    by_input = {(r["lon"], r["lat"]): r for r in rows}
    chains = [by_input[s]["route_pos_m"] for s in samples]
    for r in rows:
        assert r["route_dist_m"] <= 1.0  # slerp points sit on the route
    assert chains == sorted(chains)
    assert all(b - a > 1000.0 for a, b in zip(chains, chains[1:]))
    # interior vertex: chainage from segment 0 (pos=d12) must equal the
    # folded offset segment 1 starts from
    vdf = spark.createDataFrame([route[1]], "lon double, lat double")
    vrow = trajectory.route_locate(vdf, route).collect()[0]
    dists, chains_sql, _ = trajectory._locate_parts(
        route, "lon", "lat", None)
    both = vdf.selectExpr(
        f"{chains_sql[0]} AS c0", f"{chains_sql[1]} AS c1").collect()[0]
    assert abs(both["c0"] - both["c1"]) < 1e-6
    assert vrow["route_dist_m"] < 1e-3


def test_route_locate_plan(spark):
    route = [(0.0, 0.0), (10.0, 0.0), (20.0, 5.0)]
    df = spark.createDataFrame(
        [(5.0, 1.0), (15.0, 3.0)], "lon double, lat double")
    out = trajectory.route_locate(df, route, max_dist_m=500_000.0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_dwell_segments_crafted(spark):
    """Crafted track: dwell A (3 pts, 2 h), a 100 km jump, dwell B
    (2 pts, 10 min), another jump, a singleton. Split at 30 km, keep
    runs >= 1 h -> only dwell A survives."""
    H = 3_600_000_000
    rows = [
        # dwell A near (10, 50): steps ~1.3 km
        (1, 1, 0 * H, 10.00, 50.00),
        (1, 2, 1 * H, 10.01, 50.01),
        (1, 3, 2 * H, 10.02, 50.00),
        # jump ~100 km east, dwell B for 10 min
        (1, 4, 3 * H, 11.40, 50.00),
        (1, 5, 3 * H + H // 6, 11.41, 50.00),
        # far singleton
        (1, 6, 5 * H, 20.00, 55.00),
    ]
    df = spark.createDataFrame(
        rows, "user_id int, event_id int, ts_us long, lon double, lat double")
    allruns = trajectory.dwell_segments(df, max_step_m=30000.0)
    got = {(r["run_id"], r["n_points"], r["duration_us"])
           for r in allruns.collect()}
    assert got == {(1, 3, 2 * H), (2, 2, H // 6), (3, 1, 0)}
    kept = trajectory.dwell_segments(
        df, max_step_m=30000.0, min_duration_us=H).collect()
    assert len(kept) == 1 and kept[0]["n_points"] == 3
    assert abs(kept[0]["c_lon"] - 10.01) < 1e-6
    assert abs(kept[0]["c_lat"] - (50.0 + 50.01 + 50.0) / 3) < 1e-6


def test_dwell_centroid_wraps_at_seam(spark):
    """A dwell straddling the antimeridian averages to ±180-ish (the
    relative-mean re-anchor), where a naive avg(lon) would give ~0."""
    rows = [
        (7, 1, 0, 179.9, 10.0),
        (7, 2, 1_000_000, -179.9, 10.0),
        (7, 3, 2_000_000, 179.95, 10.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id int, event_id int, ts_us long, lon double, lat double")
    out = trajectory.dwell_segments(df, max_step_m=50000.0).collect()
    assert len(out) == 1
    c = out[0]["c_lon"]
    # mean of (179.9, -179.9=180.1, 179.95) rel to 179.9 -> 179.983...
    assert abs(abs(c) - 179.983333) < 1e-5


def test_dwell_plan_one_exchange(spark):
    rows = [(i % 3, i, i * 1_000_000, float(i % 5), float(i % 7))
            for i in range(30)]
    df = spark.createDataFrame(
        rows, "user_id int, event_id int, ts_us long, lon double, lat double")
    out = trajectory.dwell_segments(df, max_step_m=10000.0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_track_kinematics_crafted(spark):
    """Hand-checked steps: 1° east on the equator (~111.2 km) in 1000 s
    -> ~111.2 m/s due east (bearing 90); then 1° north (~111.2 km) in
    coincident time -> speed NULL; first fix all NULL."""
    rows = [
        (1, 1, 0, 0.0, 0.0),
        (1, 2, 1_000_000_000, 1.0, 0.0),
        (1, 3, 1_000_000_000, 1.0, 1.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id int, event_id int, ts_us long, lon double, lat double")
    out = {r["event_id"]: r for r in
           trajectory.track_kinematics(df, vmax_mps=50.0).collect()}
    assert out[1]["step_m"] is None and out[1]["speed_mps"] is None
    assert out[1]["dt_us"] is None and not out[1]["implausible"]
    # 1 deg of arc on R_SPHERE = 6370997 * pi/180 = 111194.9 m
    assert abs(out[2]["step_m"] - 111194.927) < 0.5
    assert abs(out[2]["speed_mps"] - 111.194927) < 1e-3
    assert abs(out[2]["bearing_deg"] - 90.0) < 1e-6
    assert out[2]["implausible"]
    assert out[3]["dt_us"] == 0 and out[3]["speed_mps"] is None
    assert abs(out[3]["bearing_deg"] - 0.0) < 1e-6
    assert not out[3]["implausible"]


def test_track_kinematics_bearing_quadrants_and_plan(spark):
    # NOTE: "due west" along a parallel is only a great-circle initial
    # bearing of 270 ON THE EQUATOR (elsewhere the great circle starts
    # poleward of the parallel — e.g. 270.38 deg at lat 50)
    rows = [
        (1, 1, 0, 10.0, 0.0),
        (1, 2, 1_000_000, 9.0, 0.0),     # due west on the equator -> 270
        (1, 3, 2_000_000, 9.0, -1.0),    # due south -> 180
        (2, 1, 0, 179.5, 0.0),
        (2, 2, 1_000_000, -179.5, 0.0),  # east across the seam -> 90
    ]
    df = spark.createDataFrame(
        rows, "user_id int, event_id int, ts_us long, lon double, lat double")
    out = trajectory.track_kinematics(df)
    got = {(r["user_id"], r["event_id"]): r for r in out.collect()}
    assert abs(got[(1, 2)]["bearing_deg"] - 270.0) < 1e-6
    assert abs(got[(1, 3)]["bearing_deg"] - 180.0) < 1e-6
    assert abs(got[(2, 2)]["bearing_deg"] - 90.0) < 1e-6
    # seam step is ~1 deg, not ~359 deg
    assert abs(got[(2, 2)]["step_m"] - 111194.927) < 0.5
    assert "implausible" not in out.columns  # vmax omitted
    # after an action AQE prints Final AND Initial plan sections — count
    # exchanges in the final section only
    plan = out._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert plan.count("Exchange hashpartitioning") == 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_track_resample_equator_linear(spark):
    """On the equator slerp is linear in longitude: fixes at (0,0) t=0
    and (10,0) t=10s resampled at 1s ticks give lon = 1..10 exactly
    (tick 0 = the first fix, emitted uninterpolated)."""
    S = 1_000_000
    rows = [(1, 1, 0, 0.0, 0.0), (1, 2, 10 * S, 10.0, 0.0)]
    df = spark.createDataFrame(
        rows, "user_id int, event_id int, ts_us long, lon double, lat double")
    out = trajectory.track_resample(df, interval_us=S).collect()
    got = {r["tick_us"] // S: r for r in out}
    assert set(got) == set(range(11))
    assert not got[0]["interpolated"]
    for k in range(1, 11):
        assert got[k]["interpolated"]
        assert abs(got[k]["lon"] - float(k)) < 1e-6, (k, got[k])
        assert abs(got[k]["lat"]) < 1e-6


def test_track_resample_matches_numpy_slerp(spark):
    """Mid-segment ticks across a seam-crossing segment match a 3D
    numpy slerp reference."""
    S = 1_000_000
    rows = [(1, 1, 0, 178.0, 10.0), (1, 2, 4 * S, -178.0, 30.0)]
    df = spark.createDataFrame(
        rows, "user_id int, event_id int, ts_us long, lon double, lat double")
    out = {r["tick_us"] // S: r for r in
           trajectory.track_resample(df, interval_us=S).collect()}
    a, b = _to_xyz(178.0, 10.0), _to_xyz(-178.0, 30.0)
    w = _ang(a, b)
    for k in range(1, 5):
        f = k / 4.0
        v = (np.sin((1 - f) * w) * a + np.sin(f * w) * b) / np.sin(w)
        lon = np.degrees(np.arctan2(v[1], v[0]))
        lat = np.degrees(np.arcsin(np.clip(v[2], -1, 1)))
        assert abs(out[k]["lon"] - lon) < 1e-5, (k, out[k], lon)
        assert abs(out[k]["lat"] - lat) < 1e-5
    # f=1 reproduces the fix itself
    assert abs(out[4]["lon"] - (-178.0)) < 1e-6
    assert abs(out[4]["lat"] - 30.0) < 1e-6


def test_track_resample_gaps_and_degenerates(spark):
    S = 1_000_000
    rows = [
        (1, 1, 0, 0.0, 0.0),
        (1, 2, 2 * S, 1.0, 0.0),
        (1, 3, 100 * S, 2.0, 0.0),   # 98 s gap > max_gap 10 s: no ticks
        (1, 4, 100 * S, 2.0, 0.0),   # coincident timestamp: no ticks
        (2, 1, S // 2, 5.0, 5.0),    # first fix off-tick: not emitted
        (2, 2, S + S // 2, 5.0, 5.0),  # coincident COORDS: snap, tick 1
    ]
    df = spark.createDataFrame(
        rows, "user_id int, event_id int, ts_us long, lon double, lat double")
    out = trajectory.track_resample(
        df, interval_us=S, max_gap_us=10 * S).collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r)
    ticks1 = sorted(r["tick_us"] // S for r in by_user[1])
    assert ticks1 == [0, 1, 2]       # the long gap emitted nothing
    ticks2 = sorted(r["tick_us"] // S for r in by_user[2])
    assert ticks2 == [1]
    r2 = by_user[2][0]
    assert abs(r2["lon"] - 5.0) < 1e-6 and abs(r2["lat"] - 5.0) < 1e-6


def test_track_resample_validation_and_plan(spark):
    with pytest.raises(ValueError, match="positive"):
        trajectory.track_resample(None, interval_us=0)
    S = 1_000_000
    rows = [(1, 1, 0, 0.0, 0.0), (1, 2, 4 * S, 4.0, 0.0)]
    df = spark.createDataFrame(
        rows, "user_id int, event_id int, ts_us long, lon double, lat double")
    out = trajectory.track_resample(df, interval_us=S)
    plan = out._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the two union branches share ONE window partitioning
    assert plan.count("Exchange hashpartitioning") <= 2


def test_route_validation():
    with pytest.raises(ValueError, match="at least 2"):
        trajectory.route_distance_sql([(0.0, 0.0)])
    with pytest.raises(ValueError, match="distinct"):
        trajectory.route_distance_sql([(0.0, 0.0), (0.0, 0.0), (1.0, 1.0)])


# ---- space-time co-location ----

def test_colocation_brute_truth_seam_and_time(spark):
    T = 3_600_000_000  # 1 h
    rows = [
        # users 1/2 straddle the antimeridian ~17 km apart; events
        # interleave within the hour -> contacts (different lon cells,
        # found only through the wrapped window)
        (100, 1, 1_000_000_000, 179.90, 10.0),
        (101, 1, 5_000_000_000, 179.92, 10.0),
        (200, 2, 1_500_000_000, -179.95, 10.05),
        (201, 2, 99_000_000_000, -179.95, 10.05),  # time-isolated
        # user 3 nearby in space but ALWAYS > 1 h away in time
        (300, 3, 50_000_000_000, 179.80, 10.1),
        # user 4 on the far side of the planet, time-aligned
        (400, 4, 1_200_000_000, 0.0, -30.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts_us bigint, "
              "lon double, lat double"
    )
    out = trajectory.colocation_pairs(
        df, max_dist_m=30_000.0, max_dt_us=T, cell_deg=1.0, lat_max=60.0
    )
    got = {(r.user_a, r.user_b, r.event_a, r.event_b):
           (r.dt_us, r.dist_m) for r in out.collect()}
    # brute truth
    exp = {}
    for (ea, ua, ta, loa, laa) in rows:
        for (eb, ub, tb, lob, lab) in rows:
            if ua < ub and abs(tb - ta) <= T:
                d = round(_hav(loa, laa, lob, lab), 3)
                if d <= 30_000.0:
                    exp[(ua, ub, ea, eb)] = tb - ta
    assert set(got) == set(exp)
    assert set(exp) == {(1, 2, 100, 200), (1, 2, 101, 200)}
    for k, dt in exp.items():
        assert got[k][0] == dt
        assert got[k][1] == pytest.approx(
            _hav(179.90 if k[2] == 100 else 179.92, 10.0, -179.95, 10.05),
            abs=2e-3,
        )


def test_colocation_validation():
    with pytest.raises(ValueError, match="bucket cover violated"):
        trajectory.colocation_pairs_sql(
            "SELECT 1", max_dist_m=500_000.0, max_dt_us=1,
            cell_deg=1.0, lat_max=60.0,
        )
    with pytest.raises(ValueError, match="nx >= 4"):
        trajectory.colocation_pairs_sql(
            "SELECT 1", max_dist_m=1.0, max_dt_us=1,
            cell_deg=120.0, lat_max=60.0,
        )
    with pytest.raises(ValueError, match="lat_max"):
        trajectory.colocation_pairs_sql(
            "SELECT 1", max_dist_m=1.0, max_dt_us=1,
            cell_deg=1.0, lat_max=95.0,
        )
    with pytest.raises(ValueError, match="max_dt_us"):
        trajectory.colocation_pairs_sql(
            "SELECT 1", max_dist_m=1.0, max_dt_us=0,
            cell_deg=1.0, lat_max=60.0,
        )


def test_colocation_plan(spark):
    df = spark.createDataFrame(
        [(1, 1, 1_000_000, 0.0, 0.0)],
        "event_id bigint, user_id bigint, ts_us bigint, "
        "lon double, lat double",
    )
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        out = trajectory.colocation_pairs(
            df, max_dist_m=10_000.0, max_dt_us=3_600_000_000,
            cell_deg=1.0, lat_max=60.0,
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        # bucketed equi-join: both sides exchange on the bucket key,
        # never a cross product
        assert plan.count("- Exchange hashpartitioning") == 2
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert plan.count("Generate") == 1
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


# ---- origin-destination flows ----

def test_od_flows_hand_truth_and_plan(spark):
    # user 1: dwell A (2 pts at lon 0), hop 1000 km east -> dwell B
    # (2 pts), hop back -> dwell C (2 pts at A's cell). Two trips:
    # A->B and B->C. user 2: a single dwell -> no trips.
    H = 3_600_000_000
    rows = [
        (1, 1, 0 * H, 0.00, 0.0), (2, 1, 2 * H, 0.01, 0.0),
        (3, 1, 10 * H, 9.00, 0.0), (4, 1, 12 * H, 9.01, 0.0),
        (5, 1, 20 * H, 0.02, 0.0), (6, 1, 22 * H, 0.03, 0.0),
        (7, 2, 0 * H, 50.0, 20.0), (8, 2, 5 * H, 50.01, 20.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts_us bigint, "
              "lon double, lat double"
    )
    out = trajectory.od_flows(
        df, max_step_m=100_000.0, min_duration_us=H, od_cell_deg=5.0
    )
    got = {(r.o_cx, r.o_cy, r.d_cx, r.d_cy): r for r in out.collect()}
    # 5-degree cells: floor(lon/5) mod 72 -> lon 0.0x in cx 0, 9.0x in cx 1
    assert set(got) == {(0, 0, 1, 0), (1, 0, 0, 0)}
    ab = got[(0, 0, 1, 0)]
    assert ab.n_trips == 1
    # travel = dwell-B start (10H) - dwell-A end (2H) = 8 h
    assert ab.sum_travel_us == 8 * H
    assert ab.avg_travel_us == pytest.approx(8 * H)
    # trip distance ~ haversine between the dwell centroids
    d = _hav(0.005, 0.0, 9.005, 0.0)
    assert ab.mean_trip_m == pytest.approx(d, abs=1e-2)
    ba = got[(1, 0, 0, 0)]
    assert ba.sum_travel_us == 8 * H
    assert ba.mean_trip_m == pytest.approx(
        _hav(9.005, 0.0, 0.025, 0.0), abs=1e-2)

    plan = out._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]  # AQE prints both plans
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # dwell windows + lead window share hashpartitioning(user_id); the
    # OD aggregate adds the second exchange
    assert plan.count("Exchange hashpartitioning") == 2


# ---------------------------------- gyration radius + location entropy


def test_gyration_radius_numpy_truth(spark):
    # user 0: tight cluster; user 1: two far-apart camps; user 2: one fix
    rows = []
    pts = {
        0: [(10.0, 20.0), (10.01, 20.0), (10.0, 20.01), (9.99, 19.99)],
        1: [(0.0, 0.0), (0.0, 0.0), (90.0, 45.0), (90.0, 45.0)],
        2: [(-170.0, -30.0)],
    }
    eid = 0
    for u, ps in pts.items():
        for lo, la in ps:
            rows.append((eid, u, lo, la))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, lon double, lat double"
    )
    got = {
        r.entity: r
        for r in trajectory.gyration_radius(df).collect()
    }
    R = 6370997.0
    for u, ps in pts.items():
        v = np.stack([
            [np.cos(np.radians(la)) * np.cos(np.radians(lo)),
             np.cos(np.radians(la)) * np.sin(np.radians(lo)),
             np.sin(np.radians(la))]
            for lo, la in ps
        ])
        m = v.mean(axis=0)
        rg = R * np.sqrt(max(0.0, 1.0 - (m ** 2).sum()))
        # the 1e-12 component quantization is amplified ~R/(2 r_g) by
        # the sqrt near |m| = 1, so centimeter-level slack for tight
        # clusters (still 5e-5 relative at 1 km gyration)
        assert got[u].r_gyr_m == pytest.approx(rg, abs=0.05), u
        clon = np.degrees(np.arctan2(m[1], m[0]))
        clat = np.degrees(np.arctan2(m[2], np.hypot(m[0], m[1])))
        assert got[u].centroid_lon == pytest.approx(clon, abs=2e-6), u
        assert got[u].centroid_lat == pytest.approx(clat, abs=2e-6), u
    # a single fix has EXACTLY zero gyration (the stationary min=max
    # pin, not the quantization noise floor) at its own centroid
    assert got[2].r_gyr_m == 0.0
    assert got[2].centroid_lon == pytest.approx(-170.0, abs=1e-6)
    # repeated identical fixes pin to exactly zero too
    dup = spark.createDataFrame(
        [(0, 9, 55.5, -12.25), (1, 9, 55.5, -12.25), (2, 9, 55.5, -12.25)],
        "event_id bigint, user_id bigint, lon double, lat double",
    )
    assert trajectory.gyration_radius(dup).collect()[0].r_gyr_m == 0.0
    # the two-camp user's radius is ~half the inter-camp chord
    assert got[1].r_gyr_m > 4e6


def test_gyration_antipodal_mean_null_centroid(spark):
    # two antipodal fixes: mean vector is ~0 -> centroid undefined
    # (NULL), r_g = R (full-sphere spread)
    df = spark.createDataFrame(
        [(0, 0, 0.0, 0.0), (1, 0, 180.0, 0.0)],
        "event_id bigint, user_id bigint, lon double, lat double",
    )
    r = trajectory.gyration_radius(df).collect()[0]
    assert r.centroid_lon is None and r.centroid_lat is None
    assert r.r_gyr_m == pytest.approx(6370997.0, abs=1e-3)


def test_gyration_plan_one_exchange(spark):
    df = spark.createDataFrame(
        [(0, 0, 1.0, 2.0)],
        "event_id bigint, user_id bigint, lon double, lat double",
    )
    plan = trajectory.gyration_radius(df)._jdf.queryExecution() \
        .executedPlan().toString().split("== Initial Plan ==")[0]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Window" not in plan and "Join" not in plan


def test_location_entropy_crafted(spark):
    # user 0: all fixes one cell -> H = 0, top_share = 1
    # user 1: 4 equal cells -> H = 2 bits, top_share = 1/4
    # user 2: 2:1:1 over 3 cells -> H = 1.5 bits
    cell = 1.0
    rows = []
    eid = 0

    def add(u, cx, k):
        nonlocal eid
        for _ in range(k):
            rows.append((eid, u, cx + 0.5, 0.5))
            eid += 1

    add(0, 0, 5)
    for cx in range(4):
        add(1, cx, 3)
    add(2, 0, 2); add(2, 1, 1); add(2, 2, 1)
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, lon double, lat double"
    )
    got = {r.entity: r for r in
           trajectory.location_entropy(df, cell_deg=cell).collect()}
    assert got[0].entropy_bits == 0.0 and got[0].top_share == 1.0
    assert got[0].n_cells == 1
    assert got[1].entropy_bits == pytest.approx(2.0, abs=1e-6)
    assert got[1].top_share == 0.25
    assert got[2].entropy_bits == pytest.approx(1.5, abs=1e-6)
    assert got[2].n_fixes == 4 and got[2].n_cells == 3


def test_location_entropy_plan(spark):
    df = spark.createDataFrame(
        [(0, 0, 1.0, 2.0)],
        "event_id bigint, user_id bigint, lon double, lat double",
    )
    plan = trajectory.location_entropy(df, cell_deg=1.0) \
        ._jdf.queryExecution().executedPlan().toString() \
        .split("== Initial Plan ==")[0]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("Exchange hashpartitioning") == 2
    assert "Window" not in plan and "Join" not in plan


# -------------------------------------------- synchronized pair join


def test_pair_sync_distance_crafted(spark):
    # users 1 and 2 walk the equator 0.5 deg apart (always "together");
    # user 3 sits 90 deg away. Fixes ON ticks so resample is exact.
    T = 1000
    rows = []
    eid = 0
    for k in range(5):
        rows.append((eid, 1, k * T, float(k), 0.0)); eid += 1
        rows.append((eid, 2, k * T, float(k) + 0.5, 0.0)); eid += 1
        rows.append((eid, 3, k * T, 90.0 + k, 0.0)); eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id bigint, user_id bigint, ts_us bigint, "
        "lon double, lat double",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3)], "user_a bigint, user_b bigint"
    )
    out = trajectory.pair_sync_distance(
        df, pairs, interval_us=T, max_gap_us=10 * T, together_m=60000.0
    )
    got = {(r.user_a, r.user_b): r for r in out.collect()}
    d_half = _hav(0.0, 0.0, 0.5, 0.0)       # ~55.6 km at the equator
    near = got[(1, 2)]
    assert near.n_sync_ticks == 5
    assert near.min_dist_m == pytest.approx(d_half, abs=0.01)
    assert near.max_dist_m == pytest.approx(d_half, abs=0.01)
    assert near.mean_dist_m == pytest.approx(d_half, abs=0.01)
    assert near.together_ratio == 1.0
    far = got[(1, 3)]
    assert far.n_sync_ticks == 5
    assert far.together_ratio == 0.0
    assert far.min_dist_m == pytest.approx(_hav(4.0, 0.0, 94.0, 0.0), abs=0.01)
    assert far.max_dist_m == pytest.approx(_hav(0.0, 0.0, 90.0, 0.0), abs=0.01)


def test_pair_sync_distance_partial_overlap(spark):
    # user 2's track covers only the back half of user 1's -> only the
    # shared ticks join; a pair with no shared ticks is absent
    T = 1000
    rows = [(0, 1, 0, 0.0, 0.0), (1, 1, 4 * T, 4.0, 0.0),
            (2, 2, 2 * T, 0.0, 1.0), (3, 2, 4 * T, 2.0, 1.0),
            (4, 9, 100 * T, 0.0, 0.0), (5, 9, 101 * T, 1.0, 0.0)]
    df = spark.createDataFrame(
        rows,
        "event_id bigint, user_id bigint, ts_us bigint, "
        "lon double, lat double",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (1, 9)], "user_a bigint, user_b bigint"
    )
    got = {(r.user_a, r.user_b): r for r in
           trajectory.pair_sync_distance(
               df, pairs, interval_us=T, max_gap_us=10 * T,
               together_m=1000.0).collect()}
    assert got[(1, 2)].n_sync_ticks == 3   # ticks 2T, 3T, 4T
    assert (1, 9) not in got               # disjoint time ranges


def test_pair_sync_distance_plan_and_validation(spark):
    df = spark.createDataFrame(
        [(0, 1, 0, 0.0, 0.0)],
        "event_id bigint, user_id bigint, ts_us bigint, "
        "lon double, lat double",
    )
    pairs = spark.createDataFrame([(1, 2)], "user_a bigint, user_b bigint")
    with pytest.raises(ValueError, match="together_m"):
        trajectory.pair_sync_distance(
            df, pairs, interval_us=1000, max_gap_us=5000, together_m=0.0)
    plan = trajectory.pair_sync_distance(
        df, pairs, interval_us=1000, max_gap_us=5000, together_m=1.0
    )._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    # the candidate table broadcasts (fan-out bounded per entity)
    assert "BroadcastHashJoin" in plan


# ------------------------------------ burstiness + direction stats


def test_burstiness_crafted(spark):
    # user 1: perfectly periodic (sigma=0 -> B=-1); user 2: bursty
    # (many short gaps + one huge); user 3: single fix -> absent
    rows = []
    eid = 0
    for k in range(6):
        rows.append((eid, 1, k * 10_000_000, 0.0, 0.0)); eid += 1
    ts = [0, 1, 2, 3, 4, 1000]
    for t in ts:
        rows.append((eid, 2, t * 1_000_000, 0.0, 0.0)); eid += 1
    rows.append((eid, 3, 5_000_000, 0.0, 0.0))
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts_us bigint, "
              "lon double, lat double")
    got = {r.entity: r for r in trajectory.burstiness(df).collect()}
    assert set(got) == {1, 2}
    assert got[1].n_gaps == 5
    assert got[1].mean_gap_s == 10.0
    assert got[1].std_gap_s == 0.0
    assert got[1].burstiness == -1.0
    gaps = np.diff(ts).astype(float)
    mu, sd = gaps.mean(), gaps.std()  # population sigma
    assert got[2].mean_gap_s == pytest.approx(mu, abs=1e-6)
    assert got[2].std_gap_s == pytest.approx(sd, abs=1e-6)
    assert got[2].burstiness == pytest.approx((sd - mu) / (sd + mu), abs=1e-6)
    assert got[2].burstiness > 0.2  # clearly burstier than periodic


def test_burstiness_subsecond_quantization(spark):
    # gaps quantize to whole seconds by FLOOR: 1.9 s and 1.1 s both
    # count as 1 s (documented: exact integer division, not rounding)
    rows = [(0, 1, 0, 0.0, 0.0), (1, 1, 1_900_000, 0.0, 0.0),
            (2, 1, 3_000_000, 0.0, 0.0)]
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts_us bigint, "
              "lon double, lat double")
    r = trajectory.burstiness(df).collect()[0]
    assert r.n_gaps == 2 and r.mean_gap_s == 1.0 and r.std_gap_s == 0.0


def test_step_direction_crafted(spark):
    # user 1: due east along the equator every step -> bearing 90, rbar 1
    # user 2: alternating east/west -> resultant cancels, rbar ~ 0
    # user 3: one NE step at the equator (bearing 45 for dlon = dlat
    # small) plus a coincident fix (excluded)
    rows = [
        (0, 1, 0, 0.0, 0.0), (1, 1, 1, 1.0, 0.0), (2, 1, 2, 2.0, 0.0),
        (10, 2, 0, 0.0, 10.0), (11, 2, 1, 1.0, 10.0),
        (12, 2, 2, 0.0, 10.0),
        (20, 3, 0, 0.0, 0.0), (21, 3, 1, 0.0, 0.0),
        (22, 3, 2, 0.01, 0.01),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts_us bigint, "
              "lon double, lat double")
    got = {r.entity: r for r in
           trajectory.step_direction_stats(df).collect()}
    assert got[1].n_steps == 2
    assert got[1].mean_bearing_deg == pytest.approx(90.0, abs=1e-6)
    assert got[1].rbar == pytest.approx(1.0, abs=1e-9)
    # east then west at the same latitude: headings differ by ~180 up
    # to the great-circle convergence; resultant nearly cancels
    assert got[2].rbar < 0.01
    assert got[3].n_steps == 1  # coincident step carries no heading
    assert got[3].mean_bearing_deg == pytest.approx(45.0, abs=0.01)
    assert got[3].rbar == pytest.approx(1.0, abs=1e-9)


def test_burst_direction_plans(spark):
    df = spark.createDataFrame(
        [(0, 1, 0, 0.0, 0.0), (1, 1, 1, 1.0, 0.0)],
        "event_id bigint, user_id bigint, ts_us bigint, "
        "lon double, lat double")
    for op in (trajectory.burstiness,
               trajectory.step_direction_stats):
        plan = op(df)._jdf.queryExecution().executedPlan().toString()
        plan = plan.split("== Initial Plan ==")[0]
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        assert plan.count("Exchange hashpartitioning") == 1, op.__name__


def test_daily_rhythm_crafted(spark):
    H = 3_600_000_000
    rows = []
    eid = 0
    # user 1: every fix at exactly 09:00 UTC (different days)
    for d in range(4):
        rows.append((eid, 1, d * 24 * H + 9 * H, 0.0, 0.0)); eid += 1
    # user 2: four fixes evenly around the clock -> resultant cancels
    for h in (0, 6, 12, 18):
        rows.append((eid, 2, h * H, 0.0, 0.0)); eid += 1
    # user 3: fixes straddling midnight (23:00 and 01:00) -> circular
    # mean is 0:00, NOT the arithmetic 12:00
    rows.append((eid, 3, 23 * H, 0.0, 0.0)); eid += 1
    rows.append((eid, 3, 24 * H + 1 * H, 0.0, 0.0)); eid += 1
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts_us bigint, "
              "lon double, lat double")
    got = {r.entity: r for r in trajectory.daily_rhythm(df).collect()}
    assert got[1].peak_hour_utc == pytest.approx(9.0, abs=1e-9)
    assert got[1].rhythm == pytest.approx(1.0, abs=1e-9)
    assert got[2].rhythm < 1e-9
    assert got[2].peak_hour_utc is None or got[2].rhythm == 0.0
    assert got[3].peak_hour_utc == pytest.approx(0.0, abs=1e-6) or \
        got[3].peak_hour_utc == pytest.approx(24.0, abs=1e-6)
    assert got[3].rhythm == pytest.approx(
        np.cos(np.radians(15.0)), abs=1e-6)  # 1h off the mean (round 6)


def test_daily_rhythm_plan(spark):
    df = spark.createDataFrame(
        [(0, 1, 0, 0.0, 0.0)],
        "event_id bigint, user_id bigint, ts_us bigint, "
        "lon double, lat double")
    plan = trajectory.daily_rhythm(df)._jdf.queryExecution() \
        .executedPlan().toString().split("== Initial Plan ==")[0]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Window" not in plan and "Join" not in plan


def test_route_usage_crafted(spark):
    # equatorial route 0 -> 10 deg E; fixes at known chainages
    route = [(0.0, 0.0), (10.0, 0.0)]
    deg_m = _hav(0.0, 0.0, 1.0, 0.0)  # meters per equatorial degree
    rows = [
        (0, 1, 0.5, 0.1),   # bin 0
        (1, 1, 0.8, -0.1),  # bin 0
        (2, 2, 0.9, 0.0),   # bin 0
        (3, 2, 5.0, 0.5),   # bin floor(5 deg / 2 deg) = 2
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, lon double, lat double")
    out = trajectory.route_usage(
        df, route, max_dist_m=200000.0, bin_m=2.0 * deg_m)
    got = {r.chain_bin: r for r in out.collect()}
    assert set(got) == {0, 2}
    assert got[0].n_fixes == 3 and got[0].n_users == 2
    assert got[2].n_fixes == 1 and got[2].n_users == 1
    # mean lateral offset of bin 0: (|0.1| + |-0.1| + 0) deg of arc / 3
    off = _hav(0.0, 0.0, 0.0, 0.1)
    assert got[0].mean_offset_m == pytest.approx(2 * off / 3, abs=1e-2)
    assert got[0].bin_start_m == 0.0
    assert got[2].bin_start_m == pytest.approx(4 * deg_m, abs=1e-6)
    with pytest.raises(ValueError, match="bin_m"):
        trajectory.route_usage(df, route, max_dist_m=1.0, bin_m=0.0)


def test_route_usage_plan(spark):
    df = spark.createDataFrame(
        [(0, 1, 0.5, 0.1)],
        "event_id bigint, user_id bigint, lon double, lat double")
    plan = trajectory.route_usage(
        df, [(0.0, 0.0), (10.0, 0.0)], max_dist_m=1e6, bin_m=1e5
    )._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Join" not in plan


def test_cell_transitions_crafted(spark):
    cell = 10.0
    # user 1 walks A(0,0) -> B(1,0) -> B -> A; user 2 does A -> B once;
    # user 3 sits in A (self-loops excluded)
    def fix(eid, u, t, cx):
        return (eid, u, t, cx * cell + 5.0, 5.0)
    rows = [
        fix(0, 1, 0, 0), fix(1, 1, 1, 1), fix(2, 1, 2, 1), fix(3, 1, 3, 0),
        fix(4, 2, 0, 0), fix(5, 2, 1, 1),
        fix(6, 3, 0, 0), fix(7, 3, 1, 0),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts_us bigint, "
              "lon double, lat double")
    got = {(r.from_cx, r.to_cx): r for r in
           trajectory.cell_transitions(df, cell_deg=cell).collect()}
    assert set(got) == {(0, 1), (1, 0)}
    ab = got[(0, 1)]
    assert ab.n_trans == 2 and ab.n_entities == 2  # users 1 and 2
    ba = got[(1, 0)]
    assert ba.n_trans == 1 and ba.n_entities == 1
    # the count floor drops the single B->A transition
    gated = {(r.from_cx, r.to_cx) for r in trajectory.cell_transitions(
        df, cell_deg=cell, min_count=2).collect()}
    assert gated == {(0, 1)}
    with pytest.raises(ValueError, match="min_count"):
        trajectory.cell_transitions(df, cell_deg=cell, min_count=0)


def test_cell_transitions_plan(spark):
    df = spark.createDataFrame(
        [(0, 1, 0, 0.0, 0.0), (1, 1, 1, 15.0, 0.0)],
        "event_id bigint, user_id bigint, ts_us bigint, "
        "lon double, lat double")
    plan = trajectory.cell_transitions(df, cell_deg=10.0) \
        ._jdf.queryExecution().executedPlan().toString() \
        .split("== Initial Plan ==")[0]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("Exchange hashpartitioning") <= 3  # lag + 2-phase distinct
    assert "Join" not in plan


# ----------------------------------------------- Knox interaction


def test_knox_crafted_counts(spark):
    # 4 events: A,B co-located AND co-timed; C co-located with A/B but
    # a week later; D far away, co-timed with A -> exact pair counts:
    # space: (A,B),(A,C),(B,C) = 3; time: (A,B),(A,D),(B,D) = 3;
    # both: (A,B) = 1; P = 6
    H = 3_600_000_000
    rows = [
        (0, 0, 10.0, 10.0),             # A
        (1, 1 * H, 10.2, 10.0),         # B (~22 km, 1 h)
        (2, 200 * H, 10.1, 10.1),       # C (close, 8+ days later)
        (3, 2 * H, 120.0, -30.0),       # D (far, 2 h)
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts_us bigint, lon double, lat double")
    r = trajectory.knox_test(
        df, delta_m=100000.0, tau_us=3 * H, cell_deg=24.0, lat_max=66.0
    ).collect()[0]
    assert r.n_events == 4
    assert r.pairs_space == 3
    assert r.pairs_time == 3
    assert r.pairs_both == 1
    assert r.expected_both == pytest.approx(3 * 3 / 6.0, abs=1e-9)
    assert r.knox_ratio == pytest.approx(1 * 6 / 9.0, abs=1e-6)


def test_knox_seam_and_boundary(spark):
    # the space pair crosses the antimeridian; the time pair sits at
    # EXACTLY tau (inclusive, <=)
    rows = [
        (0, 0, 179.9, 0.0),
        (1, 5_000_000, -179.9, 0.0),     # ~22 km across the seam
        (2, 10_000_000, 0.0, 50.0),
        (3, 10_000_000 + 3_600_000_000, 0.5, 50.0),  # exactly tau apart
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts_us bigint, lon double, lat double")
    r = trajectory.knox_test(
        df, delta_m=100000.0, tau_us=3_600_000_000,
        cell_deg=24.0, lat_max=66.0,
    ).collect()[0]
    assert r.pairs_space == 2   # the seam pair AND the 50N pair (~40km)
    assert r.pairs_both == 2    # both are also within tau
    with pytest.raises(ValueError, match="cover"):
        trajectory.knox_test(
            df, delta_m=5_000_000.0, tau_us=1000, cell_deg=24.0,
            lat_max=66.0)


def test_knox_plan_no_cartesian(spark):
    df = spark.createDataFrame(
        [(0, 0, 10.0, 10.0), (1, 1, 10.1, 10.0)],
        "event_id bigint, ts_us bigint, lon double, lat double")
    plan = trajectory.knox_test(
        df, delta_m=100000.0, tau_us=1000, cell_deg=24.0, lat_max=66.0
    )._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


# ----------------------------------------------- Ripley's K / L


def test_ripley_crafted_counts(spark):
    # a tight triple (pairwise ~22-31 km), one point ~100 km from the
    # triple's closest member, one isolated far point -> pair counts
    # by radius: 50 km: 3 (the triple), 120 km: 3 + 2? compute exactly:
    # distances A-B 22.2, A-C 22.2, B-C 31.4 (km); D is 0.9 deg east of
    # A (~100 km at equator): A-D 100.1, B-D 78.0? keep it simple and
    # assert via brute haversine below.
    import math as m

    def hav_km(p, q):
        R = 6370.997
        la1, lo1, la2, lo2 = map(m.radians, (p[1], p[0], q[1], q[0]))
        a = (m.sin((la2 - la1) / 2) ** 2
             + m.cos(la1) * m.cos(la2) * m.sin((lo2 - lo1) / 2) ** 2)
        return 2 * R * m.asin(m.sqrt(a))

    pts = [(10.0, 10.0), (10.2, 10.0), (10.1, 10.2),
           (10.9, 10.0), (120.0, -30.0)]
    rows = [(i, lo, la) for i, (lo, la) in enumerate(pts)]
    df = spark.createDataFrame(rows, "event_id bigint, lon double, lat double")
    radii = [50000.0, 120000.0, 300000.0]
    out = {
        r.r_m: r for r in trajectory.ripley_k(
            df, radii_m=radii, cell_deg=8.0, lat_max=66.0
        ).collect()
    }
    truth = {
        rk: sum(
            1
            for i in range(len(pts)) for j in range(i + 1, len(pts))
            if round(hav_km(pts[i], pts[j]) * 1000, 3) <= rk
        )
        for rk in radii
    }
    n = len(pts)
    area = 4 * m.pi * 6370997.0 ** 2 * m.sin(m.radians(66.0))
    for rk in radii:
        assert out[rk].n_events == n
        assert out[rk].pairs_within == truth[rk]
        k = area * 2 * truth[rk] / (n * (n - 1))
        assert out[rk].k_hat == pytest.approx(k, rel=1e-9)
        assert out[rk].l_hat == pytest.approx(
            m.sqrt(k / m.pi) - rk, rel=1e-6)


def test_ripley_seam_pair_and_validation(spark):
    rows = [(0, 179.95, 0.0), (1, -179.95, 0.0)]  # ~11 km across seam
    df = spark.createDataFrame(rows, "event_id bigint, lon double, lat double")
    out = trajectory.ripley_k(
        df, radii_m=[50000.0], cell_deg=8.0, lat_max=66.0
    ).collect()[0]
    assert out.pairs_within == 1
    with pytest.raises(ValueError, match="ascending"):
        trajectory.ripley_k(df, [2.0, 1.0], 8.0, 66.0)
    with pytest.raises(ValueError, match="cover"):
        trajectory.ripley_k(df, [5_000_000.0], 8.0, 66.0)


def test_ripley_plan_single_join_all_radii(spark):
    df = spark.createDataFrame(
        [(0, 10.0, 10.0), (1, 10.1, 10.0)],
        "event_id bigint, lon double, lat double")
    plan = trajectory.ripley_k(
        df, radii_m=[10000.0, 50000.0], cell_deg=8.0, lat_max=66.0
    )._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    # ALL radii share one candidate join
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") <= 1


# ------------------------------------- standard deviational ellipse


def test_directional_ellipse_numpy_truth(spark):
    import numpy as np

    # an elongated NE-SW cloud for user 1, a single fix for user 2
    pts = [(10.0 + 0.01 * i, 20.0 + 0.02 * i + (0.003 if i % 2 else 0.0))
           for i in range(12)]
    rows = [(1, lo, la) for lo, la in pts] + [(2, 50.0, 0.0)]
    df = spark.createDataFrame(rows, "user_id bigint, lon double, lat double")
    out = {r.user_id: r for r in trajectory.directional_ellipse(df).collect()}

    S = trajectory._SDE_SCALE
    rlon, rlat = min(p[0] for p in pts), min(p[1] for p in pts)
    d = np.array([p[0] for p in pts]) - rlon
    wd = ((d + 180.0) - 360.0 * np.floor((d + 180.0) / 360.0)) - 180.0
    dx = np.floor(wd * S)
    dy = np.floor((np.array([p[1] for p in pts]) - rlat) * S)
    vxx, vyy = dx.var(), dy.var()
    vxy = ((dx - dx.mean()) * (dy - dy.mean())).mean()
    half, rad = (vxx + vyy) / 2, np.hypot((vxx - vyy) / 2, vxy)
    r1 = out[1]
    assert r1.n_fixes == 12
    assert r1.center_lon == pytest.approx(rlon + dx.mean() / S, abs=2e-6)
    assert r1.center_lat == pytest.approx(rlat + dy.mean() / S, abs=2e-6)
    assert r1.sigma_major_deg == pytest.approx(
        np.sqrt(half + rad) / S, abs=2e-6)
    assert r1.sigma_minor_deg == pytest.approx(
        np.sqrt(half - rad) / S, abs=2e-6)
    theta = 0.5 * np.degrees(np.arctan2(2 * vxy, vxx - vyy))
    assert r1.theta_deg == pytest.approx(theta, abs=2e-6)
    # the cloud runs NE: major axis ~63 deg from east, clearly dominant
    assert 55 < r1.theta_deg < 72
    assert r1.sigma_major_deg > 3 * r1.sigma_minor_deg

    # single fix: zero axes, undefined orientation, center = the fix
    r2 = out[2]
    assert (r2.sigma_major_deg, r2.sigma_minor_deg) == (0.0, 0.0)
    assert r2.theta_deg is None
    assert (r2.center_lon, r2.center_lat) == (50.0, 0.0)


def test_directional_ellipse_seam_anchor(spark):
    # fixes straddling the antimeridian: min lon is -179.98 but the
    # cloud is ~0.05 deg wide, not 360 — the wrapped delta must see it
    rows = [(1, 179.97, 0.0), (1, 179.99, 0.01),
            (1, -179.99, 0.02), (1, -179.97, 0.03)]
    df = spark.createDataFrame(rows, "user_id bigint, lon double, lat double")
    r = trajectory.directional_ellipse(df).collect()[0]
    assert r.sigma_major_deg < 0.1      # NOT a 360-deg smear
    assert abs(r.center_lon) > 179.9    # center stays at the seam
    assert -180.0 <= r.center_lon < 180.0


def test_directional_ellipse_plan_one_exchange(spark):
    df = spark.createDataFrame(
        [(1, 10.0, 10.0), (1, 10.1, 10.0), (2, 50.0, 0.0)],
        "user_id bigint, lon double, lat double")
    plan = trajectory.directional_ellipse(df) \
        ._jdf.queryExecution().executedPlan().toString() \
        .split("== Initial Plan ==")[0]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # window min + moment group share ONE hashpartitioning(user_id)
    assert plan.count("Exchange hashpartitioning") == 1


def test_ripley_cross_k_crafted(spark):
    # 2 A events each within 50 km of the B pair; one far A; one far B
    rows = [
        (0, 10.0, 10.0, "a"), (1, 10.2, 10.0, "a"), (2, 60.0, 0.0, "a"),
        (3, 10.1, 10.1, "b"), (4, 10.3, 10.1, "b"), (5, -120.0, 30.0, "b"),
        (6, 0.0, 0.0, "c"),  # matches neither -> ignored
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, lon double, lat double, cls string")
    out = {r.r_m: r for r in trajectory.ripley_cross_k(
        df, "cls = 'a'", "cls = 'b'", [50000.0, 300000.0],
        cell_deg=8.0, lat_max=66.0,
    ).collect()}
    r1 = out[50000.0]
    assert (r1.n_a, r1.n_b) == (3, 3)
    # pairs within 50 km: (0,3)~18km, (1,3)~15km, (1,4)~15km, (0,4)~35km
    assert r1.pairs_ab == 4
    assert out[300000.0].pairs_ab == 4  # far points stay out


def test_ripley_cross_k_overlap_raises(spark):
    df = spark.createDataFrame(
        [(0, 10.0, 10.0, "a")],
        "event_id bigint, lon double, lat double, cls string")
    with pytest.raises(Exception, match="predicates overlap"):
        trajectory.ripley_cross_k(
            df, "cls = 'a'", "cls like 'a%'", [50000.0],
            cell_deg=8.0, lat_max=66.0,
        ).collect()


# ------------------------------------- Clark-Evans NN index


def test_nn_index_crafted(spark):
    import math as m

    # a tight pair (NN = each other), a third point whose NN is the
    # pair (~55 km), and a censored loner with no neighbor in range
    rows = [(0, 10.0, 0.0), (1, 10.1, 0.0), (2, 10.6, 0.0),
            (3, 90.0, 40.0)]
    df = spark.createDataFrame(rows, "event_id bigint, lon double, lat double")
    r = trajectory.nn_index(
        df, search_r_m=200000.0, cell_deg=8.0, lat_max=66.0
    ).collect()[0]
    assert (r.n_events, r.n_with_neighbor) == (4, 3)
    assert r.coverage == pytest.approx(0.75, abs=1e-9)
    R = 6370997.0
    deg = m.pi / 180.0 * R  # meters per degree along the equator
    d01 = 0.1 * deg
    d12 = 0.5 * deg
    # NN: 0->1, 1->0, 2->1; mm-rounded like the engine
    exp_mean = (2 * round(d01 * 1000) + round(d12 * 1000)) / 3 / 1000
    assert r.mean_nn_m == pytest.approx(exp_mean, abs=1e-5)
    lam = 4 / (4 * m.pi * R * R * m.sin(m.radians(66.0)))
    assert r.r_expected_m == pytest.approx(0.5 / m.sqrt(lam), rel=1e-9)
    assert r.ce_index == pytest.approx(
        exp_mean / (0.5 / m.sqrt(lam)), abs=2e-6)
    # four points over half the planet: wildly dispersed is NOT the
    # call here — the tight pair makes the observed mean tiny
    assert r.pattern == "clustered"


def test_nn_index_plan_no_cartesian(spark):
    df = spark.createDataFrame(
        [(0, 10.0, 10.0), (1, 10.1, 10.0)],
        "event_id bigint, lon double, lat double")
    plan = trajectory.nn_index(
        df, search_r_m=100000.0, cell_deg=8.0, lat_max=66.0
    )._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


# ------------------------------------- space-time K surface


def test_spacetime_k_reduces_to_knox_at_single_scale(spark):
    # at a single (s, t) the surface IS the Knox test
    H = 3_600_000_000
    rows = [
        (0, 0, 10.0, 10.0), (1, 1 * H, 10.2, 10.0),
        (2, 200 * H, 10.1, 10.1), (3, 2 * H, 120.0, -30.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts_us bigint, lon double, lat double")
    k = trajectory.knox_test(
        df, delta_m=100000.0, tau_us=3 * H, cell_deg=24.0, lat_max=66.0
    ).collect()[0]
    s = trajectory.spacetime_k(
        df, radii_m=[100000.0], taus_us=[3 * H],
        cell_deg=24.0, lat_max=66.0,
    ).collect()[0]
    assert (s.pairs_space, s.pairs_time, s.pairs_both) == (
        k.pairs_space, k.pairs_time, k.pairs_both)
    assert s.ratio == k.knox_ratio
    assert s.d0 == pytest.approx(k.knox_ratio - 1.0, abs=1e-9)


def test_spacetime_k_grid_monotone(spark):
    # counts must be monotone nondecreasing in both scale axes
    H = 3_600_000_000
    rows = [(i, (i % 7) * H, 10.0 + 0.3 * (i % 5), 10.0 + 0.2 * (i % 3))
            for i in range(30)]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts_us bigint, lon double, lat double")
    out = trajectory.spacetime_k(
        df, radii_m=[60000.0, 120000.0], taus_us=[2 * H, 5 * H],
        cell_deg=24.0, lat_max=66.0,
    ).collect()
    g = {(r.s_m, r.tau_us): r for r in out}
    assert len(g) == 4
    assert g[(60000.0, 2 * H)].pairs_both <= g[(120000.0, 2 * H)].pairs_both
    assert g[(60000.0, 2 * H)].pairs_both <= g[(60000.0, 5 * H)].pairs_both
    assert g[(60000.0, 2 * H)].pairs_space == g[(60000.0, 5 * H)].pairs_space
    assert g[(60000.0, 2 * H)].pairs_time == g[(120000.0, 2 * H)].pairs_time
    with pytest.raises(ValueError, match="ascending"):
        trajectory.spacetime_k(df, [2.0, 1.0], [H], 24.0, 66.0)


# ------------------------------------------- empirical semivariogram


def test_semivariogram_numpy_truth(spark):
    import math as m

    # two spatial clusters with distinct value regimes: nearby pairs
    # have small value diffs, far pairs large ones -> gamma rises with
    # lag (the spatial-continuity signature the variogram measures)
    pts = [
        (10.0, 10.0, 5.00), (10.2, 10.0, 5.10), (10.1, 10.2, 4.90),
        (14.0, 10.0, 9.00), (14.2, 10.1, 9.20),
    ]
    rows = [(i, lo, la, v) for i, (lo, la, v) in enumerate(pts)]
    df = spark.createDataFrame(
        rows, "event_id bigint, lon double, lat double, value double")
    bounds = [60000.0, 300000.0, 600000.0]
    out = {r.hi_m: r for r in trajectory.semivariogram(
        df, "value", bounds_m=bounds, cell_deg=24.0, lat_max=66.0
    ).collect()}

    def hav_mm(p, q):
        R = 6370997.0
        la1, lo1, la2, lo2 = map(m.radians, (p[1], p[0], q[1], q[0]))
        a = (m.sin((la2 - la1) / 2) ** 2
             + m.cos(la1) * m.cos(la2) * m.sin((lo2 - lo1) / 2) ** 2)
        return round(2 * R * m.asin(m.sqrt(a)) * 1000)

    S = trajectory._SVG_SCALE
    lo_mm = 0
    for hi in bounds:
        hi_mm = round(hi * 1000)
        sel = [
            (hav_mm(pts[i][:2], pts[j][:2]),
             (round(pts[i][2] * S) - round(pts[j][2] * S)) ** 2)
            for i in range(len(pts)) for j in range(i + 1, len(pts))
            if lo_mm < hav_mm(pts[i][:2], pts[j][:2]) <= hi_mm
        ]
        r = out[hi]
        assert r.n_pairs == len(sel)
        if sel:
            g = sum(dd for _, dd in sel) / (2 * len(sel) * S * S)
            assert r.gamma == pytest.approx(g, abs=1e-6)
            md = sum(d for d, _ in sel) / 1000.0 / len(sel)
            assert r.mean_d_m == pytest.approx(md, abs=1e-5)
        else:
            assert r.gamma is None and r.mean_d_m is None
        lo_mm = hi_mm
    # continuity signature: the near-lag gamma is far below the far-lag
    assert out[60000.0].gamma < out[600000.0].gamma


def test_semivariogram_null_values_and_validation(spark):
    df = spark.createDataFrame(
        [(0, 10.0, 10.0, 1.0), (1, 10.1, 10.0, None), (2, 10.2, 10.0, 3.0)],
        "event_id bigint, lon double, lat double, value double")
    out = trajectory.semivariogram(
        df, "value", [300000.0], cell_deg=24.0, lat_max=66.0
    ).collect()
    # the NULL-valued point joins no pair: exactly one pair remains
    assert out[0].n_pairs == 1
    with pytest.raises(ValueError, match="ascending"):
        trajectory.semivariogram(df, "value", [2.0, 1.0], 24.0, 66.0)
    with pytest.raises(ValueError, match="cover"):
        trajectory.semivariogram(df, "value", [5_000_000.0], 24.0, 66.0)


def test_semivariogram_plan_single_join_all_bins(spark):
    df = spark.createDataFrame(
        [(0, 10.0, 10.0, 1.0), (1, 10.1, 10.0, 2.0)],
        "event_id bigint, lon double, lat double, value double")
    plan = trajectory.semivariogram(
        df, "value", [60000.0, 300000.0], cell_deg=24.0, lat_max=66.0
    )._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    # ALL lag bins share one candidate join
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") <= 1


# ------------------------------------------ G / F / J functions


def test_gfj_crafted_truth(spark):
    import math as m

    # a tight pair (NN ~ 22 km each) + an isolated point: G jumps to
    # 2/3 at the first radius and stays (the isolated point's NN is
    # far beyond max(r)); F counts lattice points near ANY event
    pts = [(10.0, 10.0), (10.2, 10.0), (90.0, 40.0)]
    rows = [(i, lo, la) for i, (lo, la) in enumerate(pts)]
    df = spark.createDataFrame(rows, "event_id bigint, lon double, lat double")
    radii = [50000.0, 300000.0]
    out = {r.r_m: r for r in trajectory.gfj_functions(
        df, radii_m=radii, grid_deg=15.0, cell_deg=8.0, lat_max=66.0
    ).collect()}

    def hav_mm(p, q):
        R = 6370997.0
        la1, lo1, la2, lo2 = map(m.radians, (p[1], p[0], q[1], q[0]))
        a = (m.sin((la2 - la1) / 2) ** 2
             + m.cos(la1) * m.cos(la2) * m.sin((lo2 - lo1) / 2) ** 2)
        return round(2 * R * m.asin(m.sqrt(a)) * 1000)

    grid = trajectory._gfj_grid(15.0, 66.0)
    for rk in radii:
        rmm = round(rk * 1000)
        g_true = sum(
            1 for i, p in enumerate(pts)
            if min(hav_mm(p, q) for j, q in enumerate(pts) if j != i)
            <= rmm
        )
        f_true = sum(
            1 for _, glo, gla in grid
            if min(hav_mm((glo, gla), p) for p in pts) <= rmm
        )
        r = out[rk]
        assert r.n_events == 3 and r.n_grid == len(grid)
        assert r.nn_le == g_true and r.empty_le == f_true
        g, f = g_true / 3.0, f_true / len(grid)
        assert r.g_hat == pytest.approx(g, abs=1e-6)
        assert r.f_hat == pytest.approx(f, abs=1e-6)
        if f < 1.0:
            assert r.j_hat == pytest.approx((1 - g) / (1 - f), abs=1e-5)
    assert out[50000.0].nn_le == 2  # the tight pair, not the loner


def test_gfj_grid_validation_and_plan(spark):
    with pytest.raises(ValueError, match="divide 360"):
        trajectory._gfj_grid(7.0, 66.0)
    grid = trajectory._gfj_grid(15.0, 66.0)
    # all test cells fully inside the band
    assert all(abs(la) <= 66.0 - 7.5 + 1e-9 for _, _, la in grid)
    df = spark.createDataFrame(
        [(0, 10.0, 10.0), (1, 10.1, 10.0)],
        "event_id bigint, lon double, lat double")
    plan = trajectory.gfj_functions(
        df, radii_m=[50000.0], grid_deg=30.0, cell_deg=8.0,
        lat_max=66.0,
    )._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


# ------------------------------------------- colocation quotient


def test_clq_crafted_attraction(spark):
    # every 'a' point sits right beside a 'b' point (~11 km); the 'b'
    # points' nearest are each other or the paired 'a'; pattern: A is
    # strongly attracted to B (CLQ_ab > 1), A never neighbors A
    rows = [
        (0, 10.0, 10.0, "a"), (1, 10.1, 10.0, "b"),
        (2, 20.0, 10.0, "a"), (3, 20.1, 10.0, "b"),
        (4, 30.0, 10.0, "a"), (5, 30.1, 10.0, "b"),
        (6, 40.0, 40.0, "b"), (7, 40.1, 40.0, "b"),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, lon double, lat double, cat string")
    out = {(r.cat_a, r.cat_b): r for r in trajectory.colocation_quotient(
        df, "cat", search_r_m=300000.0, cell_deg=8.0, lat_max=66.0
    ).collect()}
    ab = out[("a", "b")]
    # all 3 a-points neighbor a b-point
    assert ab.c_ab == 3 and ab.n_a_nn == 3 and ab.n_a == 3
    assert ab.n_b == 5 and ab.n_tot == 8
    # CLQ_ab = (3/3) / (5/7) = 1.4
    assert ab.clq == pytest.approx(1.4, abs=1e-6)
    assert ab.coverage_a == pytest.approx(1.0)
    assert ("a", "a") not in out  # no a->a neighbor pairs observed
    bb = out[("b", "b")]
    # the far pair neighbor each other; paired b's nearest is its a
    assert bb.c_ab == 2
    # CLQ_bb = (2/5) / ((5-1)/7) = 0.7
    assert bb.clq == pytest.approx(0.7, abs=1e-6)


def test_clq_tie_break_and_censoring(spark):
    # two neighbors at EXACTLY the same distance (symmetric lons):
    # the (d_mm, id) key picks the lower event id deterministically;
    # the isolated point is censored (reduces coverage, not c_ab)
    rows = [
        (10, 10.0, 20.0, "x"),
        (5, 10.5, 20.0, "y"),   # east, same |dlon|
        (7, 9.5, 20.0, "z"),    # west, same |dlon|
        (99, 120.0, -50.0, "x"),  # isolated
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, lon double, lat double, cat string")
    out = {(r.cat_a, r.cat_b): r for r in trajectory.colocation_quotient(
        df, "cat", search_r_m=300000.0, cell_deg=8.0, lat_max=66.0
    ).collect()}
    # event 10's NN tie (5 vs 7) breaks to id 5 -> type 'y'
    assert ("x", "y") in out and ("x", "z") not in out
    x = out[("x", "y")]
    assert x.n_a == 2 and x.n_a_nn == 1  # the loner is censored
    assert x.coverage_a == pytest.approx(0.5)


def test_clq_plan_no_cartesian(spark):
    df = spark.createDataFrame(
        [(0, 10.0, 10.0, "a"), (1, 10.1, 10.0, "b")],
        "event_id bigint, lon double, lat double, cat string")
    plan = trajectory.colocation_quotient(
        df, "cat", search_r_m=300000.0, cell_deg=8.0, lat_max=66.0
    )._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


# ------------------------- pair correlation function (O-ring)


def test_pcf_crafted_counts(spark):
    import math as m

    def hav_m(p, q):
        R = 6370997.0
        la1, lo1, la2, lo2 = map(m.radians, (p[1], p[0], q[1], q[0]))
        a = (m.sin((la2 - la1) / 2) ** 2
             + m.cos(la1) * m.cos(la2) * m.sin((lo2 - lo1) / 2) ** 2)
        return 2 * R * m.asin(m.sqrt(a))

    pts = [(10.0, 10.0), (10.2, 10.0), (10.1, 10.2),
           (10.9, 10.0), (120.0, -30.0)]
    rows = [(i, lo, la) for i, (lo, la) in enumerate(pts)]
    df = spark.createDataFrame(
        rows, "event_id bigint, lon double, lat double")
    edges = [0.0, 50000.0, 120000.0, 300000.0]
    out = {
        (r.r_lo, r.r_hi): r for r in trajectory.pair_correlation(
            df, edges_m=edges, cell_deg=8.0, lat_max=66.0
        ).collect()
    }
    assert set(out) == set(zip(edges, edges[1:]))
    n = len(pts)
    R = 6370997.0
    area = 4 * m.pi * R * R * m.sin(m.radians(66.0))
    total = 0
    for lo, hi in zip(edges, edges[1:]):
        ring = sum(
            1
            for i in range(len(pts)) for j in range(i + 1, len(pts))
            if lo < round(hav_m(pts[i], pts[j]), 3) <= hi
        )
        r = out[(lo, hi)]
        assert r.n_events == n
        assert r.pairs_in_ring == ring
        a_ring = 2 * m.pi * R * R * (m.cos(lo / R) - m.cos(hi / R))
        g = area * 2 * ring / (n * (n - 1) * a_ring)
        assert r.g_hat == pytest.approx(g, abs=2e-6)
        total += ring
    # rings partition (0, 300km]: ring sums == ripley pairs_within(300km)
    rip = trajectory.ripley_k(
        df, radii_m=[300000.0], cell_deg=8.0, lat_max=66.0
    ).collect()[0]
    assert total == rip.pairs_within


def test_pcf_seam_colocated_and_validation(spark):
    # seam pair lands in ring 1; an exactly co-located pair (d = 0)
    # falls in NO ring when edges[0] = 0 (half-open bins)
    rows = [(0, 179.95, 0.0), (1, -179.95, 0.0),
            (2, 50.0, 20.0), (3, 50.0, 20.0)]
    df = spark.createDataFrame(
        rows, "event_id bigint, lon double, lat double")
    out = {r.r_lo: r for r in trajectory.pair_correlation(
        df, edges_m=[0.0, 50000.0], cell_deg=8.0, lat_max=66.0
    ).collect()}
    assert out[0.0].pairs_in_ring == 1  # the seam pair only
    with pytest.raises(ValueError, match="ascending"):
        trajectory.pair_correlation(df, [10.0, 5.0], 8.0, 66.0)
    with pytest.raises(ValueError, match=">= 2 edges"):
        trajectory.pair_correlation(df, [10.0], 8.0, 66.0)
    with pytest.raises(ValueError, match="cover"):
        trajectory.pair_correlation(df, [0.0, 5_000_000.0], 8.0, 66.0)


def test_pcf_plan_single_join_all_rings(spark):
    df = spark.createDataFrame(
        [(0, 10.0, 10.0), (1, 10.1, 10.0)],
        "event_id bigint, lon double, lat double")
    plan = trajectory.pair_correlation(
        df, edges_m=[0.0, 10000.0, 50000.0], cell_deg=8.0, lat_max=66.0
    )._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") <= 1


# ------------------------- mark correlation function (Stoyan kmm)


def test_kmm_brute_truth(spark):
    import math as m

    def hav_m(p, q):
        R = 6370997.0
        la1, lo1, la2, lo2 = map(m.radians, (p[1], p[0], q[1], q[0]))
        a = (m.sin((la2 - la1) / 2) ** 2
             + m.cos(la1) * m.cos(la2) * m.sin((lo2 - lo1) / 2) ** 2)
        return 2 * R * m.asin(m.sqrt(a))

    # clustered points carry LARGE marks, the far point a small one ->
    # kmm > 1 in the short-lag bin
    pts = [(10.0, 10.0, 8.25), (10.2, 10.0, 9.5), (10.1, 10.2, 7.75),
           (10.9, 10.0, 1.0), (120.0, -30.0, 0.5)]
    rows = [(i, lo, la, v) for i, (lo, la, v) in enumerate(pts)]
    df = spark.createDataFrame(
        rows, "event_id bigint, lon double, lat double, value double")
    bounds = [50000.0, 120000.0, 300000.0]
    out = {(r.lo_m, r.hi_m): r for r in trajectory.mark_correlation(
        df, "value", bounds_m=bounds, cell_deg=8.0, lat_max=66.0
    ).collect()}
    qv = [round(v * 100) for *_, v in pts]
    n, sq = len(pts), sum(qv)
    lo = 0.0
    for hi in bounds:
        n_p = spp = 0
        for i in range(len(pts)):
            for j in range(i + 1, len(pts)):
                d_mm = round(hav_m(pts[i], pts[j]) * 1000)
                if lo * 1000 < d_mm <= hi * 1000:
                    n_p += 1
                    spp += qv[i] * qv[j]
        r = out[(lo, hi)]
        assert r.n_pairs == n_p, (lo, hi)
        if n_p:
            want = spp * n * n / (n_p * sq * sq)
            assert r.kmm == pytest.approx(want, abs=2e-6), (lo, hi)
        else:
            assert r.kmm is None
        lo = hi
    # the clustered large marks dominate the first bin
    assert out[(0.0, 50000.0)].kmm > 1.0


def test_kmm_null_marks_and_plan(spark):
    rows = [(0, 10.0, 10.0, 5.0), (1, 10.1, 10.0, None),
            (2, 10.2, 10.0, 3.0)]
    df = spark.createDataFrame(
        rows, "event_id bigint, lon double, lat double, value double")
    out = trajectory.mark_correlation(
        df, "value", bounds_m=[50000.0], cell_deg=8.0, lat_max=66.0
    ).collect()[0]
    # NULL-marked point excluded from n, sq AND pairs
    assert out.n_pairs == 1
    q0, q2 = 500, 300
    want = (q0 * q2) * 4 / (1 * (q0 + q2) ** 2)
    assert out.kmm == pytest.approx(want, abs=2e-6)
    plan = trajectory.mark_correlation(
        df, "value", bounds_m=[50000.0], cell_deg=8.0, lat_max=66.0
    )._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") <= 1


# ------------------------ Rayleigh directional uniformity test


def test_rayleigh_brute_truth(spark):
    import math as m

    # entity 1: due-east march (maximally directed); entity 2: four
    # orthogonal unit steps (resultant ~0); entity 3: single step
    # (n=1 -> dropped)
    rows = []
    for i in range(6):
        rows.append((1, i, 1000 * i, 10.0 + 0.1 * i, 0.0))
    walk = [(0.0, 0.0), (0.1, 0.0), (0.1, 0.1), (0.0, 0.1), (0.0, 0.0)]
    for i, (dlo, dla) in enumerate(walk):
        rows.append((2, 100 + i, 1000 * i, 50.0 + dlo, 20.0 + dla))
    rows += [(3, 200, 0, 0.0, 0.0), (3, 201, 1000, 1.0, 0.0)]
    df = spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, ts_us bigint, "
        "lon double, lat double")
    out = {r.entity: r for r in trajectory.rayleigh_test(df).collect()}
    assert set(out) == {1, 2}  # entity 3 has n=1 -> dropped
    # brute: recompute from quantized bearing vectors
    def bearing_vec(p, q):
        la1, lo1, la2, lo2 = map(m.radians, (p[1], p[0], q[1], q[0]))
        dl = lo2 - lo1
        y = m.sin(dl) * m.cos(la2)
        x = (m.cos(la1) * m.sin(la2)
             - m.sin(la1) * m.cos(la2) * m.cos(dl))
        h = m.hypot(y, x)
        return y / h, x / h

    by_ent = {}
    for uid, eid, ts, lo, la in rows:
        by_ent.setdefault(uid, []).append((ts, eid, lo, la))
    for ent in (1, 2):
        pts = sorted(by_ent[ent])
        se = sn = n = 0
        for p, q in zip(pts, pts[1:]):
            if (p[2], p[3]) == (q[2], q[3]):
                continue
            e, no = bearing_vec((p[2], p[3]), (q[2], q[3]))
            se += round(e * 1e12)
            sn += round(no * 1e12)
            n += 1
        r2 = (se * se + sn * sn) / 1e24
        z = r2 / n
        p_val = min(1.0, m.exp(
            m.sqrt(1 + 4 * n + 4 * (n * n - r2)) - (1 + 2 * n)))
        r = out[ent]
        assert r.n_steps == n
        assert r.rayleigh_z == pytest.approx(z, abs=2e-6), ent
        assert r.p_value == pytest.approx(p_val, abs=2e-6), ent
    assert out[1].movement == "directed"
    assert out[1].rayleigh_z == pytest.approx(out[1].n_steps, rel=1e-4)
    assert out[2].movement == "uniform"
    assert out[2].p_value > 0.5


def test_rayleigh_validation_and_plan(spark):
    df = spark.createDataFrame(
        [(1, 0, 0, 0.0, 0.0), (1, 1, 1000, 1.0, 0.0),
         (1, 2, 2000, 2.0, 0.0)],
        "user_id bigint, event_id bigint, ts_us bigint, "
        "lon double, lat double")
    with pytest.raises(ValueError, match="alpha"):
        trajectory.rayleigh_test(df, alpha=0.0)
    plan = trajectory.rayleigh_test(
        df)._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    # the lag window and the entity aggregate share ONE partitioning
    assert plan.count("Exchange hashpartitioning") <= 1


# -------------------------- directional semivariogram (anisotropy)


def test_svg_directional_anisotropy(spark):
    import math as m

    # a smooth E-W gradient field on an E-W line + a rough N-S pair:
    # the E-W sector must show a much lower gamma than N-S
    rows = []
    for i in range(8):
        rows.append((i, 10.0 + 0.3 * i, 10.0, 1.0 + 0.01 * i))
    rows += [(100, 12.0, 11.5, 9.0), (101, 12.0, 12.5, 1.0)]
    df = spark.createDataFrame(
        rows, "event_id bigint, lon double, lat double, value double")
    out = trajectory.semivariogram_directional(
        df, "value", bounds_m=[300000.0], cell_deg=8.0, lat_max=66.0
    ).collect()
    got = {r.sector: r for r in out}
    assert set(got) == {"NS", "NE", "EW", "SE"}
    assert got["EW"].n_pairs > 0 and got["NS"].n_pairs > 0
    assert got["EW"].gamma < got["NS"].gamma
    # brute replay: classify every pair by the same azimuth rule
    def hav_mm(p, q):
        R = 6370997.0
        la1, lo1, la2, lo2 = map(m.radians, (p[1], p[0], q[1], q[0]))
        aa = (m.sin((la2 - la1) / 2) ** 2
              + m.cos(la1) * m.cos(la2) * m.sin((lo2 - lo1) / 2) ** 2)
        return round(2 * R * m.asin(m.sqrt(aa)) * 1000)

    pts = [(lo, la, v) for _, lo, la, v in rows]
    want = {s: [0, 0] for s in range(4)}
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            d = hav_mm(pts[i], pts[j])
            if not 0 < d <= 300000000:
                continue
            dlon = pts[j][0] - pts[i][0]
            dlat = pts[j][1] - pts[i][1]
            mid = (pts[i][1] + pts[j][1]) / 2
            az = m.degrees(m.atan2(
                dlon * m.cos(m.radians(mid)), dlat)) % 180.0
            sct = int((az + 22.5) // 45) % 4
            qa = round(pts[i][2] * 100)
            qb = round(pts[j][2] * 100)
            want[sct][0] += 1
            want[sct][1] += (qa - qb) ** 2
    names = ["NS", "NE", "EW", "SE"]
    for s in range(4):
        r = got[names[s]]
        assert r.n_pairs == want[s][0], names[s]
        if want[s][0]:
            gamma = want[s][1] / (2 * want[s][0] * 100 * 100)
            assert r.gamma == pytest.approx(gamma, abs=2e-6), names[s]
        else:
            assert r.gamma is None


def test_svg_directional_plan(spark):
    df = spark.createDataFrame(
        [(0, 10.0, 10.0, 1.0), (1, 10.1, 10.0, 2.0)],
        "event_id bigint, lon double, lat double, value double")
    plan = trajectory.semivariogram_directional(
        df, "value", bounds_m=[50000.0], cell_deg=8.0, lat_max=66.0
    )._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") <= 1


# ----------------------------------------------- variogram model fit


def _vfit_brute(bins, bounds, ranges, model):
    """Constrained-WLS truth over the (n_pairs, gamma, mean_d) rows."""
    def basis(h, a):
        if model == "exponential":
            return 1.0 - np.exp(-3.0 * h / a)
        r = h / a
        return 1.0 if h >= a else 1.5 * r - 0.5 * r ** 3

    rows = [(w, g, h) for (w, g, h) in bins if w > 0]
    best = None
    for a in ranges:
        w = np.array([r[0] for r in rows], float)
        g = np.array([r[1] for r in rows], float)
        f = np.array([basis(r[2], a) for r in rows], float)
        sw, swf, swff = w.sum(), (w * f).sum(), (w * f * f).sum()
        swg, swfg, swgg = (w * g).sum(), (w * f * g).sum(), (w * g * g).sum()

        def sse(c0, c1):
            return (swgg - 2 * c0 * swg - 2 * c1 * swfg + c0 * c0 * sw
                    + 2 * c0 * c1 * swf + c1 * c1 * swff)

        den = sw * swff - swf * swf
        sols = []
        if den > 0:
            c1u = (sw * swfg - swf * swg) / den
            c0u = (swg - c1u * swf) / sw
            if c0u >= 0 and c1u >= 0:
                sols.append((sse(c0u, c1u), c0u, c1u))
        c1a = max(0.0, swfg / swff) if swff > 0 else 0.0
        sols.append((sse(0.0, c1a), 0.0, c1a))
        c0b = max(0.0, swg / sw)
        sols.append((sse(c0b, 0.0), c0b, 0.0))
        s, c0, c1 = min(sols, key=lambda t: t[0])
        if best is None or s < best[0] - 1e-12:
            best = (s, a, c0, c1)
    return best  # (sse, range, nugget, psill)


def _gdf(spark, bins, bounds):
    lows = [0.0] + list(bounds[:-1])
    rows = [
        (lows[i], bounds[i], int(w),
         None if w == 0 else float(g), None if w == 0 else float(h))
        for i, (w, g, h) in enumerate(bins)
    ]
    return spark.createDataFrame(
        rows, "lo_m double, hi_m double, n_pairs bigint, gamma double, "
        "mean_d_m double")


def test_variogram_fit_recovers_planted_model(spark):
    bounds = [50e3, 100e3, 200e3, 400e3, 800e3]
    ranges = [75e3, 150e3, 300e3, 600e3]
    for model in ("exponential", "spherical"):
        a_true, c0_true, c1_true = 300e3, 0.4, 2.5

        def basis(h):
            if model == "exponential":
                return 1.0 - np.exp(-3.0 * h / a_true)
            r = h / a_true
            return 1.0 if h >= a_true else 1.5 * r - 0.5 * r ** 3

        hs = [30e3, 80e3, 150e3, 310e3, 650e3]
        bins = [(100, c0_true + c1_true * basis(h), h) for h in hs]
        r = trajectory.variogram_fit(
            _gdf(spark, bins, bounds), bounds, ranges, model
        ).collect()[0]
        s, a, c0, c1 = _vfit_brute(bins, bounds, ranges, model)
        assert r.model == model and r.n_bins_used == 5
        assert r.range_m == pytest.approx(a, abs=1e-6)
        assert a == a_true  # planted range is in the grid -> recovered
        assert r.nugget == pytest.approx(c0, abs=1e-6)
        assert r.psill == pytest.approx(c1, abs=1e-6)
        assert abs(r.nugget - c0_true) < 1e-6
        assert abs(r.psill - c1_true) < 1e-6
        assert r.sill == pytest.approx(c0 + c1, abs=1e-6)
        assert r.wsse == pytest.approx(max(s, 0.0), abs=1e-5)


def test_variogram_fit_flat_unequal_weights_and_degenerate(spark):
    bounds = [50e3, 100e3, 200e3]
    ranges = [60e3, 120e3]
    # flat gamma, unequal weights -> pure nugget = weighted mean, no range
    bins = [(10, 2.0, 30e3), (30, 2.0, 80e3), (60, 2.0, 150e3)]
    r = trajectory.variogram_fit(
        _gdf(spark, bins, bounds), bounds, ranges).collect()[0]
    assert r.range_m is None and r.psill == 0.0
    assert r.nugget == pytest.approx(2.0, abs=1e-9)
    assert r.wsse == pytest.approx(0.0, abs=1e-9)
    # rising gamma with unequal weights: match the brute optimum
    bins = [(100, 1.0, 30e3), (20, 2.5, 80e3), (5, 3.1, 150e3)]
    r = trajectory.variogram_fit(
        _gdf(spark, bins, bounds), bounds, ranges).collect()[0]
    s, a, c0, c1 = _vfit_brute(bins, bounds, ranges, "exponential")
    assert r.nugget == pytest.approx(c0, abs=1e-6)
    assert r.psill == pytest.approx(c1, abs=1e-6)
    assert (r.range_m or 0.0) == (a if c1 > 0 else 0.0)
    # < 3 non-empty bins -> NULL fit, n_bins_used kept
    bins = [(10, 1.0, 30e3), (0, 0.0, 0.0), (10, 2.0, 150e3)]
    r = trajectory.variogram_fit(
        _gdf(spark, bins, bounds), bounds, ranges).collect()[0]
    assert r.n_bins_used == 2
    assert r.range_m is None and r.nugget is None and r.wsse is None


def test_variogram_fit_validation_and_plan(spark):
    bounds = [50e3, 100e3, 200e3]
    g = _gdf(spark, [(1, 1.0, 30e3)] * 3, bounds)
    with pytest.raises(ValueError, match="model"):
        trajectory.variogram_fit(g, bounds, [1.0, 2.0], "gaussian")
    with pytest.raises(ValueError, match="ascending"):
        trajectory.variogram_fit(g, bounds, [2.0, 1.0])
    with pytest.raises(ValueError, match="3 lag bins"):
        trajectory.variogram_fit(g, [1.0, 2.0], [1.0, 2.0])
    with pytest.raises(ValueError, match="2..24"):
        trajectory.variogram_fit(g, bounds, [1.0])
    plan = trajectory.variogram_fit(
        g, bounds, [60e3, 120e3]
    )._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "BatchEvalPython" not in plan and "CartesianProduct" not in plan


# ------------------------------------------ space-time semivariogram


def test_semivariogram_st_brute(spark):
    import math as m

    # same spatial layout as the spatial test, but values drift over
    # time: pairs at short TIME lag agree, long-lag pairs diverge
    pts = [
        (10.0, 10.0, 0, 5.00), (10.2, 10.0, 1000, 5.10),
        (10.1, 10.2, 9000, 7.90), (14.0, 10.0, 0, 9.00),
        (14.2, 10.1, 9500, 6.20), (10.05, 10.05, 0, 5.02),
    ]
    rows = [(i, t, lo, la, v) for i, (lo, la, t, v) in enumerate(pts)]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts_us bigint, lon double, lat double, "
        "value double")
    bounds = [60000.0, 600000.0]
    tb = [2000, 10000]
    out = {(r.hi_m, r.hi_us): r for r in trajectory.semivariogram_st(
        df, "value", bounds_m=bounds, t_bounds_us=tb,
        cell_deg=24.0, lat_max=66.0
    ).collect()}
    assert len(out) == 4

    def hav_mm(p, q):
        R = 6370997.0
        la1, lo1, la2, lo2 = map(m.radians, (p[1], p[0], q[1], q[0]))
        a = (m.sin((la2 - la1) / 2) ** 2
             + m.cos(la1) * m.cos(la2) * m.sin((lo2 - lo1) / 2) ** 2)
        return round(2 * R * m.asin(m.sqrt(a)) * 1000)

    S = trajectory._SVG_SCALE
    lo_mm = 0
    for hi in bounds:
        hi_mm = round(hi * 1000)
        t_lo = -1
        for th in tb:
            sel = []
            for i in range(len(pts)):
                for j in range(i + 1, len(pts)):
                    d = hav_mm(pts[i][:2], pts[j][:2])
                    dt = abs(pts[i][2] - pts[j][2])
                    if lo_mm < d <= hi_mm and t_lo < dt <= th:
                        sel.append(
                            (d, (round(pts[i][3] * S)
                                 - round(pts[j][3] * S)) ** 2))
            r = out[(hi, th)]
            assert r.n_pairs == len(sel), (hi, th)
            if sel:
                g = sum(dd for _, dd in sel) / (2 * len(sel) * S * S)
                assert r.gamma == pytest.approx(g, abs=1e-6), (hi, th)
            else:
                assert r.gamma is None
            t_lo = th
        lo_mm = hi_mm
    # the ht=0 column exists: simultaneous pairs (dt=0) are counted
    assert out[(60000.0, 2000)].n_pairs >= 1
    # temporal decorrelation signature at short spatial lag
    assert out[(60000.0, 2000)].gamma < out[(60000.0, 10000)].gamma


def test_semivariogram_st_validation(spark):
    df = spark.createDataFrame(
        [(0, 0, 10.0, 10.0, 1.0)],
        "event_id bigint, ts_us bigint, lon double, lat double, "
        "value double")
    with pytest.raises(ValueError, match="ascending"):
        trajectory.semivariogram_st(
            df, "value", [60000.0], [200, 100], 24.0, 66.0)
    with pytest.raises(ValueError, match="1..8"):
        trajectory.semivariogram_st(
            df, "value", [60000.0], list(range(1, 11)), 24.0, 66.0)
    plan = trajectory.semivariogram_st(
        df, "value", [60000.0], [1000], 24.0, 66.0
    )._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "BatchEvalPython" not in plan and "CartesianProduct" not in plan


def test_variogram_fit_by_sector(spark):
    bounds = [50e3, 100e3, 200e3, 400e3, 800e3]
    ranges = [75e3, 150e3, 300e3, 600e3]
    hs = [30e3, 80e3, 150e3, 310e3, 650e3]
    planted = {"EW": 600e3, "NS": 150e3}  # anisotropy: EW smoother

    def basis(h, a):
        return 1.0 - np.exp(-3.0 * h / a)

    rows = []
    lows = [0.0] + bounds[:-1]
    for sct, a_true in planted.items():
        for i, h in enumerate(hs):
            rows.append((sct, lows[i], bounds[i], 100,
                         float(0.2 + 1.5 * basis(h, a_true)), float(h)))
    gdf = spark.createDataFrame(
        rows, "sector string, lo_m double, hi_m double, n_pairs bigint, "
        "gamma double, mean_d_m double")
    out = {r.sector: r for r in trajectory.variogram_fit(
        gdf, bounds, ranges, by=("sector",)).collect()}
    assert set(out) == {"EW", "NS"}
    assert out["EW"].range_m == pytest.approx(600e3)
    assert out["NS"].range_m == pytest.approx(150e3)
    for r in out.values():
        assert r.nugget == pytest.approx(0.2, abs=1e-6)
        assert r.psill == pytest.approx(1.5, abs=1e-6)


# ---------------------------------------------------------- F-madogram


def test_fmadogram_brute(spark):
    import math as m

    # near cluster spikes TOGETHER (joint extremes), the far point is
    # independent -> near-lag theta ~ 1, far-lag theta larger
    pts = [
        (10.0, 10.0, 9.00), (10.2, 10.0, 9.10), (10.1, 10.2, 8.90),
        (17.0, 10.0, 1.00), (14.0, 10.0, 5.00), (14.2, 10.1, 1.10),
    ]
    rows = [(i, lo, la, v) for i, (lo, la, v) in enumerate(pts)]
    df = spark.createDataFrame(
        rows, "event_id bigint, lon double, lat double, value double")
    bounds = [60000.0, 600000.0]
    out = {r.hi_m: r for r in trajectory.fmadogram(
        df, "value", bounds_m=bounds, cell_deg=24.0, lat_max=66.0
    ).collect()}

    def hav_mm(p, q):
        R = 6370997.0
        la1, lo1, la2, lo2 = map(m.radians, (p[1], p[0], q[1], q[0]))
        a = (m.sin((la2 - la1) / 2) ** 2
             + m.cos(la1) * m.cos(la2) * m.sin((lo2 - lo1) / 2) ** 2)
        return round(2 * R * m.asin(m.sqrt(a)) * 1000)

    # brute mid-ranks of the quantized values
    qs = sorted(round(v * 100) for _, _, v in pts)
    n = len(pts)
    r2 = {}
    for qv in set(qs):
        less = sum(1 for x in qs if x < qv)
        cnt = qs.count(qv)
        r2[qv] = 2 * less + cnt + 1
    lo_mm = 0
    for hi in bounds:
        hi_mm = round(hi * 1000)
        sel = [
            abs(r2[round(pts[i][2] * 100)] - r2[round(pts[j][2] * 100)])
            for i in range(n) for j in range(i + 1, n)
            if lo_mm < hav_mm(pts[i][:2], pts[j][:2]) <= hi_mm
        ]
        r = out[hi]
        assert r.n_pairs == len(sel)
        if sel:
            nu = sum(sel) / (4.0 * len(sel) * n)
            assert r.fmadogram == pytest.approx(round(nu, 6), abs=1e-9)
            assert r.ext_coef == pytest.approx(
                round((1 + 2 * nu) / (1 - 2 * nu), 6), abs=1e-9)
        lo_mm = hi_mm
    # joint-extremes signature: near-lag theta below far-lag theta
    assert out[60000.0].ext_coef < out[600000.0].ext_coef
    plan = trajectory.fmadogram(
        df, "value", bounds, 24.0, 66.0
    )._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "BatchEvalPython" not in plan and "CartesianProduct" not in plan
