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


def test_route_validation():
    with pytest.raises(ValueError, match="at least 2"):
        trajectory.route_distance_sql([(0.0, 0.0)])
    with pytest.raises(ValueError, match="distinct"):
        trajectory.route_distance_sql([(0.0, 0.0), (0.0, 0.0), (1.0, 1.0)])
