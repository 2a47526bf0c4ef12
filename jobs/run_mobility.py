#!/usr/bin/env python
"""spark-submit entry job: resumable mobility pipeline
(clean -> dwells -> OD flows).

    spark-submit --py-files dist/ocgis_spark.zip jobs/run_mobility.py \
        --input /root/testdata/sf0.01 --output /tmp/mobility_out \
        [--vmax 350] [--max-step-m 30000] [--min-duration-h 12] \
        [--od-cell-deg 5] [--shards 16]

The trajectory family's production composition (the same resumable
posture as ``jobs/run_dedup.py``; checkpoint machinery
``ocgis_spark/checkpoint.py`` ⇌ the reference's resumable tiled
execution, ``/root/reference/src/ocgis/util/large_array.py:170-218``):

1. **Dwell build** (the expensive corpus pass) — derive (lon, lat) if
   the input lacks them (the driver's events table carries none; the
   deterministic fixture derivation applies), screen GPS jitter with
   the per-step kinematics speed gate (``track_kinematics``:
   teleporting fixes would split dwells and fabricate trips), then
   ``dwell_segments``. The DWELL table — bounded by stays, orders of
   magnitude smaller than fixes — lands at ``<output>/dwells/`` behind
   Spark's atomic ``_SUCCESS`` marker: a resumed run skips the whole
   corpus pass.
2. **OD flows** — ``od_flows_from_dwells`` over the persisted dwell
   table, written per OD-cell hash shard through
   ``CheckpointManager.run_stage`` (dynamic partition overwrite +
   manifest rows carrying the dwell-table lineage fingerprint). Killed
   mid-write, committed shards never re-run; a changed dwell table
   (different fingerprint) is refused rather than silently mixed.

Both phases are pure DataFrame plans: one entity exchange for the
kinematics lag + dwell windows, one exchange to the OD grain.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def _geo_events(spark, input_dir: str):
    """events.parquet with (event_id, user_id, ts_us, lon, lat) — the
    deterministic geo derivation applies when the source has no
    coordinates (the driver's synthetic events)."""
    ev = spark.read.parquet(os.path.join(input_dir, "events.parquet"))
    if "lon" in ev.columns and "lat" in ev.columns:
        if "ts_us" not in ev.columns:
            ev = ev.withColumn(
                "ts_us", F.expr("unix_micros(CAST(ts AS TIMESTAMP))")
            )
        return ev.select("event_id", "user_id", "ts_us", "lon", "lat")
    from ocgis_spark import fixtures as FX

    ev.createOrReplaceTempView("events")
    return spark.sql(
        FX.events_geo_sql(ts_us="unix_micros(CAST(ts AS TIMESTAMP))")
    )


def run(
    spark: SparkSession,
    input_dir: str,
    output: str,
    vmax_mps: float = 350.0,
    max_step_m: float = 30000.0,
    min_duration_us: int = 43_200_000_000,
    od_cell_deg: float = 5.0,
    shards: int = 16,
) -> dict:
    """Execute (or resume) the pipeline; returns the phase-2 stage
    result dict plus dwell/flow locations."""
    from ocgis_spark.checkpoint import CheckpointManager, lineage_fingerprint
    from ocgis_spark.operators import trajectory

    dwells_dir = os.path.join(output, "dwells")
    if not os.path.exists(os.path.join(dwells_dir, "_SUCCESS")):
        ev = _geo_events(spark, input_dir)
        kin = trajectory.track_kinematics(ev, vmax_mps=vmax_mps)
        clean = kin.filter(~F.col("implausible")).select(
            "event_id", "user_id", "ts_us", "lon", "lat"
        )
        dw = trajectory.dwell_segments(
            clean, max_step_m=max_step_m,
            min_duration_us=min_duration_us,
        )
        # atomic phase commit: _SUCCESS publishes last, so a mid-write
        # kill leaves no marker and the corpus pass cleanly re-runs
        dw.write.mode("overwrite").parquet(dwells_dir)
        resumed_dwells = False
    else:
        resumed_dwells = True
    dw = spark.read.parquet(dwells_dir)

    flows = trajectory.od_flows_from_dwells(dw, od_cell_deg=od_cell_deg)
    flows = flows.withColumn(
        "shard_id",
        F.pmod(
            F.xxhash64("o_cx", "o_cy", "d_cx", "d_cy"), F.lit(shards)
        ).cast("int"),
    )
    mgr = CheckpointManager(os.path.join(output, "flows"))
    res = mgr.run_stage(
        spark, flows, tile_col="shard_id",
        lineage=lineage_fingerprint(
            dw, ["user_id", "run_id", "start_us", "end_us"]
        ),
    )
    res["dwells_dir"] = dwells_dir
    res["data_dir"] = mgr.data_dir
    res["resumed_dwells"] = resumed_dwells
    return res


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="dir with events.parquet")
    ap.add_argument("--output", required=True, help="checkpoint/output root")
    ap.add_argument("--vmax", type=float, default=350.0,
                    help="speed gate, m/s (drop faster fixes)")
    ap.add_argument("--max-step-m", type=float, default=30000.0)
    ap.add_argument("--min-duration-h", type=float, default=12.0)
    ap.add_argument("--od-cell-deg", type=float, default=5.0)
    ap.add_argument("--shards", type=int, default=16)
    args = ap.parse_args()

    spark = (
        SparkSession.builder.appName("ocgis_spark_mobility")
        # engine-required semantics (master comes from spark-submit)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .getOrCreate()
    )
    res = run(
        spark, args.input, args.output, vmax_mps=args.vmax,
        max_step_m=args.max_step_m,
        min_duration_us=int(args.min_duration_h * 3_600_000_000),
        od_cell_deg=args.od_cell_deg, shards=args.shards,
    )
    print(
        f"dwell phase: {'resumed' if res['resumed_dwells'] else 'built'} "
        f"at {res['dwells_dir']}; flow phase: "
        f"processed={len(res['processed'])} shards, "
        f"skipped(resume)={len(res['skipped'])}; data at {res['data_dir']}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
