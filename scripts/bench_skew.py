#!/usr/bin/env python
"""Contact-join skew stress (VERDICT r4 ask #8): demonstrate that a
planted pathological bucket (a "stadium" — one spatio-temporal bucket
holding >= 100x the median bucket's events) does not collapse
``colocation_pairs`` into a single-task straggler at local[32].

The docstring posture (trajectory.py colocation_pairs) defers the
stadium case to AQE skew-join; this records the evidence. Uniform
corpus: N events hash-scattered over the bucket lattice (median bucket
~ N / n_buckets). Hot corpus: same + H = 100 x median events in ONE
cell within one tau window. The hot bucket adds ~9 H^2 candidate pairs;
with the skew split active the wall should track the ~work ratio, not
the straggler. Prints one JSON line with both walls, the work-adjusted
ratio, and whether the executed plan shows the skew split.

Run: python scripts/bench_skew.py   (appends nothing; BENCH.md cites it)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ocgis_spark.operators import trajectory as TJ  # noqa: E402
from ocgis_spark.session import get_spark  # noqa: E402

N_UNIFORM = 200_000
HOT_MULT = 100
CELL = 1.0
LAT_MAX = 60.0
TAU_US = 60_000_000  # 60 s co-location window
DIST_M = 50_000.0


def _uniform(spark, n):
    """Hash-scattered events: ~n/(360*120) per 1-degree cell."""
    return spark.range(n).selectExpr(
        "id AS event_id",
        "id % 50000 AS user_id",
        # md5-slice placement: uniform, no RNG
        "CAST(conv(substring(md5(concat('u', id)), 1, 6), 16, 10) AS DOUBLE)"
        " / 16777216.0 * 360.0 - 180.0 AS lon",
        "CAST(conv(substring(md5(concat('v', id)), 1, 6), 16, 10) AS DOUBLE)"
        " / 16777216.0 * 118.0 - 59.0 AS lat",
        "CAST(conv(substring(md5(concat('t', id)), 1, 6), 16, 10) AS BIGINT)"
        f" * 100000 AS ts_us",  # ~0..1.6e12 us spread
    )


def _hot(spark, h):
    """The stadium: h events inside ONE cell within one tau window."""
    return spark.range(h).selectExpr(
        "id + 10000000 AS event_id",
        "id + 10000000 AS user_id",  # distinct entities -> real pairs
        "10.1 + CAST(conv(substring(md5(concat('x', id)), 1, 6), 16, 10)"
        " AS DOUBLE) / 16777216.0 * 0.5 AS lon",
        "10.1 + CAST(conv(substring(md5(concat('y', id)), 1, 6), 16, 10)"
        " AS DOUBLE) / 16777216.0 * 0.5 AS lat",
        "CAST(conv(substring(md5(concat('z', id)), 1, 6), 16, 10)"
        f" AS BIGINT) % {TAU_US} AS ts_us",
    )


def _run(df) -> tuple[float, int, str]:
    out = TJ.colocation_pairs(
        df, max_dist_m=DIST_M, max_dt_us=TAU_US, cell_deg=CELL,
        lat_max=LAT_MAX,
    )
    t0 = time.time()
    n = out.count()
    wall = time.time() - t0
    plan = out._jdf.queryExecution().executedPlan().toString()
    return wall, n, plan


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("skew_stress", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    uni = _uniform(spark, N_UNIFORM).persist()
    n_uni = uni.count()
    median = N_UNIFORM / (360 * 118)  # events per cell

    best_u, pairs_u = float("inf"), 0
    for _ in range(3):
        w, pairs_u, _ = _run(uni)
        best_u = min(best_u, w)

    for mult in (HOT_MULT, 1000):
        hot_h = int(mult * max(median, 1.0))
        hot = uni.unionByName(_hot(spark, hot_h)).persist()
        hot.count()
        best_h, pairs_h, plan_h = float("inf"), 0, ""
        for _ in range(3):
            w, pairs_h, plan_h = _run(hot)
            best_h = min(best_h, w)
        print(json.dumps({
            "metric": "colocation_pairs skew stress (stadium bucket)",
            "n_uniform": n_uni,
            "hot_bucket_events": hot_h,
            "hot_vs_median_bucket": mult,
            "pairs_uniform": pairs_u,
            "pairs_hot": pairs_h,
            "wall_uniform_s": round(best_u, 3),
            "wall_hot_s": round(best_h, 3),
            "ratio": round(best_h / best_u, 3),
            "skew_split_in_plan": ("skew=true" in plan_h.lower())
            or ("skewjoin" in plan_h.lower()),
            "cpus": cpus,
        }))
        hot.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
