"""End-to-end + resume test for jobs/run_mobility.py: speed-gated
kinematics, atomic dwell phase, checkpointed OD-flow shards, and the
operator-equivalence of the job's output."""

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "jobs"))
import run_mobility  # noqa: E402

SF = "/root/testdata/sf0.01"


def test_run_mobility_end_to_end_and_resume(spark, tmp_path):
    out = str(tmp_path / "mob")
    kw = dict(vmax_mps=350.0, max_step_m=30000.0,
              min_duration_us=43_200_000_000, od_cell_deg=5.0, shards=4)
    res = run_mobility.run(spark, SF, out, **kw)
    assert not res["resumed_dwells"]
    assert res["processed"] and not res["skipped"]
    assert os.path.exists(os.path.join(res["dwells_dir"], "_SUCCESS"))

    # the job's flow table equals the od_flows operator on the same
    # speed-gated events (shard_id aside)
    from ocgis_spark.operators import trajectory

    ev = run_mobility._geo_events(spark, SF)
    clean = trajectory.track_kinematics(ev, vmax_mps=350.0).filter(
        ~F.col("implausible")
    ).select("event_id", "user_id", "ts_us", "lon", "lat")
    want = trajectory.od_flows(
        clean, max_step_m=30000.0, min_duration_us=43_200_000_000,
        od_cell_deg=5.0,
    )
    got = spark.read.parquet(res["data_dir"]).drop("shard_id")
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0

    # resume: nothing re-runs — the corpus pass is skipped via the
    # _SUCCESS marker and every committed shard via the manifest
    res2 = run_mobility.run(spark, SF, out, **kw)
    assert res2["resumed_dwells"]
    assert not res2["processed"]
    assert sorted(res2["skipped"]) == res["processed"]


def test_run_mobility_lineage_guard(spark, tmp_path):
    out = str(tmp_path / "mob2")
    kw = dict(vmax_mps=350.0, max_step_m=30000.0,
              min_duration_us=43_200_000_000, od_cell_deg=5.0, shards=2)
    run_mobility.run(spark, SF, out, **kw)
    # corrupt the dwell phase output (simulate changed inputs behind a
    # kept manifest): the flow stage must refuse, not silently mix
    import glob
    import pytest

    dw = spark.read.parquet(os.path.join(out, "dwells")).limit(3)
    dw.write.mode("overwrite").parquet(os.path.join(out, "_tmp_dw"))
    for f in glob.glob(os.path.join(out, "dwells", "*.parquet")):
        os.remove(f)
    for f in glob.glob(os.path.join(out, "_tmp_dw", "*.parquet")):
        os.rename(f, os.path.join(out, "dwells", os.path.basename(f)))
    with pytest.raises(ValueError, match="lineage fingerprint"):
        run_mobility.run(spark, SF, out, **kw)
