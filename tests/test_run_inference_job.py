"""End-to-end + resume test for jobs/run_inference.py: atomic corpus
aggregation, the permutation panel over materialized aggregates, and
equivalence with the in-engine operators on the same events."""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "jobs"))
import run_inference  # noqa: E402

SF = "/root/testdata/sf0.01"


def test_run_inference_end_to_end_and_resume(spark, tmp_path):
    out = str(tmp_path / "inf")
    kw = dict(cell_deg=5.0, lat0=-65.0, lat1=65.0, n_reps=19, shards=4)
    res = run_inference.run(spark, SF, out, **kw)
    assert not res["resumed_aggregates"]
    assert res["processed"] and not res["skipped"]
    assert os.path.exists(os.path.join(out, "cell_counts", "_SUCCESS"))

    # the job's statistics equal the operators run directly on the
    # same geo events (same seeds -> identical permutations)
    from ocgis_spark import fixtures as FX
    from ocgis_spark.operators import gridstats as GS

    ev = FX.register_events_geo(spark, SF)
    want = GS.morans_i_p(
        ev, cell_deg=5.0, lat0=-65.0, lat1=65.0, n_reps=19
    ).collect()[0].asDict()
    got = res["scalars"]["morans_i_p"]
    assert got == want

    scan_want = GS.spacetime_scan_p(
        ev, cell_deg=15.0, lat0=-60.0, lat1=60.0,
        t0_us=1_704_067_200_000_000, bin_us=172_800_000_000,
        n_bins=15, n_reps=19,
    ).collect()[0].asDict()
    assert res["scalars"]["spacetime_scan_p"] == scan_want

    lisa = spark.read.parquet(res["data_dir"]).drop("shard_id")
    lisa_want = GS.local_morans_i_p(
        ev, cell_deg=5.0, lat0=-65.0, lat1=65.0, n_reps=19
    )
    assert lisa.count() == lisa_want.count() > 0
    assert lisa.exceptAll(lisa_want).count() == 0

    # scalars parquet round-trips
    sc = {
        r["statistic"]: json.loads(r["result"])
        for r in spark.read.parquet(os.path.join(out, "scalars")).collect()
    }
    assert set(sc) == {"global_autocorr_p", "morans_i_p",
                       "spacetime_scan_p", "spacetime_scan_top",
                       "temporal_scan_p"}

    # resume: corpus pass skipped, committed shards never re-run
    res2 = run_inference.run(spark, SF, out, **kw)
    assert res2["resumed_aggregates"]
    assert not res2["processed"]
    assert sorted(res2["skipped"]) == sorted(res["processed"])
