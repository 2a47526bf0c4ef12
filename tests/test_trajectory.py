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
