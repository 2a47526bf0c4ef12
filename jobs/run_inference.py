#!/usr/bin/env python
"""spark-submit entry job: resumable spatial-inference panel
(corpus aggregation -> permutation/Monte-Carlo statistics).

    spark-submit --py-files dist/ocgis_spark.zip jobs/run_inference.py \
        --input /root/testdata/sf0.01 --output /tmp/inference_out \
        [--cell-deg 5] [--lat0 -65] [--lat1 65] [--n-reps 199] \
        [--scan-cell-deg 15] [--bins 15] [--shards 16]

The r5 inference battery's production composition (same resumable
posture as ``jobs/run_dedup.py`` / ``run_mobility.py``):

1. **Corpus aggregation** (the only corpus-scale pass) — the geo event
   stream aggregates to TWO lattice-bounded tables: per-cell counts
   (Moran/LISA/autocorr lattice) and per-(cell, time-bin) counts (the
   scan lattice). Both land behind atomic ``_SUCCESS`` markers; a
   resumed run never re-reads the corpus.
2. **Inference panel** — every permutation/Monte-Carlo statistic runs
   over the MATERIALIZED aggregates via the builders'
   ``counts_override`` hooks (the 10^12-doc posture: replications touch
   lattice-bounded state only):
   - ``global_autocorr_p`` — Moran's I + Geary's C + General G pseudo-p
     from one shared permutation set (1 row),
   - ``morans_i_p`` (1 row, kept for its richer tail columns),
   - ``spacetime_scan_p`` — SaTScan max-LLR Monte-Carlo p (1 row),
   - ``spacetime_scan_top`` — primary + secondary clusters with p,
   - ``temporal_scan_p`` — the 1-D burst alarm over the SAME bin
     marginal (derived from the materialized (cell, bin) table),
   - ``local_morans_i_p`` — the per-cell LISA significance map, written
     per hash shard through ``CheckpointManager.run_stage`` with the
     cell-table lineage fingerprint (killed mid-write, committed shards
     never re-run; a changed aggregate is refused, not silently mixed).
   The scalar rows land at ``<output>/scalars/`` in one parquet.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def _geo_events(spark, input_dir: str):
    ev = spark.read.parquet(os.path.join(input_dir, "events.parquet"))
    if "lon" in ev.columns and "lat" in ev.columns:
        if "ts_us" not in ev.columns:
            ev = ev.withColumn(
                "ts_us", F.expr("unix_micros(CAST(ts AS TIMESTAMP))")
            )
        return ev
    from ocgis_spark import fixtures as FX

    ev.createOrReplaceTempView("events")
    return spark.sql(
        FX.events_geo_sql(ts_us="unix_micros(CAST(ts AS TIMESTAMP))")
    )


def run(
    spark: SparkSession,
    input_dir: str,
    output: str,
    cell_deg: float = 5.0,
    lat0: float = -65.0,
    lat1: float = 65.0,
    n_reps: int = 199,
    scan_cell_deg: float = 15.0,
    scan_lat: float = 60.0,
    t0_us: int = 1_704_067_200_000_000,
    bin_us: int = 172_800_000_000,
    n_bins: int = 15,
    shards: int = 16,
) -> dict:
    from ocgis_spark.checkpoint import CheckpointManager, lineage_fingerprint
    from ocgis_spark.operators import gridstats as GS

    # ---- phase 1: the corpus pass -> two lattice-bounded aggregates
    cell_dir = os.path.join(output, "cell_counts")
    stc_dir = os.path.join(output, "cellbin_counts")
    resumed = os.path.exists(os.path.join(cell_dir, "_SUCCESS")) and (
        os.path.exists(os.path.join(stc_dir, "_SUCCESS"))
    )
    if not resumed:
        ev = _geo_events(spark, input_dir)
        ev.createOrReplaceTempView("_inf_src")
        cy0, cy1 = GS._lat_band(cell_deg, lat0, lat1)
        spark.sql(GS._counts_sql(
            "SELECT * FROM _inf_src", cell_deg, cy0, cy1, "lon", "lat",
        )).write.mode("overwrite").parquet(cell_dir)
        scy0, scy1 = GS._lat_band(scan_cell_deg, -scan_lat, scan_lat)
        spark.sql(GS._counts_scan_sql(
            "SELECT * FROM _inf_src", scan_cell_deg, scy0, scy1,
            t0_us, bin_us, n_bins, "ts_us", "lon", "lat",
        )).write.mode("overwrite").parquet(stc_dir)
    cells = spark.read.parquet(cell_dir).localCheckpoint()
    cells.createOrReplaceTempView("_inf_cells")
    stc = spark.read.parquet(stc_dir).localCheckpoint()
    stc.createOrReplaceTempView("_inf_stc")
    co = "SELECT cx, cy, cnt FROM _inf_cells"
    sco = "SELECT cx, cy, tb, cnt FROM _inf_stc"
    src = "SELECT NULL AS lon, NULL AS lat, NULL AS ts_us"  # never read

    # ---- phase 2: the inference panel over the materialized tables
    scalars = []
    auto = spark.sql(GS.global_autocorr_p_sql(
        src, cell_deg, lat0, lat1, n_reps=n_reps, counts_override=co,
    )).collect()[0].asDict()
    scalars.append(("global_autocorr_p", auto))
    mor = spark.sql(GS.morans_i_p_sql(
        src, cell_deg, lat0, lat1, n_reps=n_reps, counts_override=co,
    )).collect()[0].asDict()
    scalars.append(("morans_i_p", mor))
    scan = spark.sql(GS.spacetime_scan_p_sql(
        src, scan_cell_deg, -scan_lat, scan_lat, t0_us, bin_us, n_bins,
        n_reps=n_reps, counts_override=sco,
    )).collect()[0].asDict()
    scalars.append(("spacetime_scan_p", scan))
    top = [r.asDict() for r in spark.sql(GS.spacetime_scan_top_sql(
        src, scan_cell_deg, -scan_lat, scan_lat, t0_us, bin_us, n_bins,
        n_reps=n_reps, k=3, counts_override=sco,
    )).collect()]
    scalars.append(("spacetime_scan_top", top))
    tburst = spark.sql(GS.temporal_scan_p_sql(
        src, t0_us, bin_us, n_bins, n_reps=n_reps,
        counts_override=f"SELECT tb, CAST(sum(cnt) AS BIGINT) AS cnt "
        f"FROM _inf_stc GROUP BY 1",
    )).collect()[0].asDict()
    scalars.append(("temporal_scan_p", tburst))
    sc_rows = [
        (name, json.dumps(d, default=str)) for name, d in scalars
    ]
    spark.createDataFrame(
        sc_rows, "statistic string, result string"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(output, "scalars")
    )

    lisa = spark.sql(GS.local_morans_i_p_sql(
        src, cell_deg, lat0, lat1, n_reps=n_reps, counts_override=co,
    )).withColumn(
        "shard_id",
        F.pmod(F.xxhash64("cell_x", "cell_y"), F.lit(shards)).cast("int"),
    )
    mgr = CheckpointManager(os.path.join(output, "lisa_p"))
    res = mgr.run_stage(
        spark, lisa, tile_col="shard_id",
        lineage=lineage_fingerprint(cells, ["cx", "cy", "cnt"]),
    )
    res["resumed_aggregates"] = resumed
    res["scalars"] = {k: v for k, v in scalars}
    res["data_dir"] = mgr.data_dir
    return res


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--cell-deg", type=float, default=5.0)
    ap.add_argument("--lat0", type=float, default=-65.0)
    ap.add_argument("--lat1", type=float, default=65.0)
    ap.add_argument("--n-reps", type=int, default=199)
    ap.add_argument("--scan-cell-deg", type=float, default=15.0)
    ap.add_argument("--bins", type=int, default=15)
    ap.add_argument("--shards", type=int, default=16)
    args = ap.parse_args()
    from pyspark.sql import SparkSession

    # engine-required confs only — the master comes from spark-submit
    # (get_spark pins local[N], which would silently run a submitted
    # cluster job entirely on the driver; ADVICE r5). Same pattern as
    # jobs/run_dedup.py / run_mobility.py.
    spark = (
        SparkSession.builder.appName("run_inference")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    res = run(
        spark, args.input, args.output, cell_deg=args.cell_deg,
        lat0=args.lat0, lat1=args.lat1, n_reps=args.n_reps,
        scan_cell_deg=args.scan_cell_deg, n_bins=args.bins,
        shards=args.shards,
    )
    print(json.dumps(
        {k: v for k, v in res.items() if k != "scalars"}, default=str
    ))


if __name__ == "__main__":
    main()
