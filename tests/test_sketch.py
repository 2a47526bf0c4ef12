"""HLL-shape distinct sketch: accuracy, mergeability, state size."""

import pytest
from pyspark.sql import functions as F

from ocgis_spark.operators import sketch


def test_estimate_accuracy(spark):
    # 6000 distinct values across 3 keys, with heavy duplication
    df = spark.range(24000).select(
        (F.col("id") % 3).alias("k"), (F.col("id") % 6000).alias("v")
    )
    est = {
        r["k"]: r["est_distinct"]
        for r in sketch.hll_estimate(sketch.hll_sketch(df, ["k"], "v"), ["k"]).collect()
    }
    # per key: 2000 distinct values; m=256 -> ~1.04/sqrt(m) ~ 6.5% stderr
    for k in range(3):
        assert est[k] == pytest.approx(2000, rel=0.2)


def test_merge_equals_whole(spark):
    df = spark.range(10000).select(
        F.lit("a").alias("k"), (F.col("id") % 3777).alias("v")
    )
    lo = df.filter(F.col("v") % 2 == 0)
    hi = df.filter(F.col("v") % 2 == 1)
    merged = sketch.hll_merge(
        sketch.hll_sketch(lo, ["k"], "v"), sketch.hll_sketch(hi, ["k"], "v")
    )
    whole = sketch.hll_sketch(df, ["k"], "v")
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))


def test_state_is_bounded(spark):
    df = spark.range(200000).select(F.lit("k").alias("k"), F.col("id").alias("v"))
    sk = sketch.hll_sketch(df, ["k"], "v")
    assert sk.count() <= sketch.M_REGS


def test_histogram_quantile_near_exact(spark):
    import numpy as np

    rng = np.random.default_rng(3)
    vals = rng.uniform(0.0, 100.0, size=5000)
    df = spark.createDataFrame(
        [(int(i % 2), float(v)) for i, v in enumerate(vals)], "k int, v double"
    )
    got = {
        r["k"]: r["quantile"]
        for r in sketch.histogram_quantile(df, ["k"], "v", 0.9, 0.0, 128.0).collect()
    }
    width = 128.0 / 512
    for k in range(2):
        exact = float(np.quantile(vals[k::2], 0.9))
        assert abs(got[k] - exact) <= width + 0.05


def test_histogram_quantile_clamps_out_of_range(spark):
    df = spark.createDataFrame(
        [("a", -5.0), ("a", 1.0), ("a", 500.0)], "k string, v double"
    )
    row = sketch.histogram_quantile(df, ["k"], "v", 1.0, 0.0, 128.0).collect()[0]
    # max clamps into the top bin
    assert row["quantile"] == pytest.approx(128.0 - 128.0 / 512 / 2)


def test_rho_sql_matches_python(spark):
    # rho = 1-based lowest-set-bit position of floor(h/m)
    rows = spark.sql(
        f"SELECT h, {sketch.rho_sql('h')} AS rho FROM "
        "(SELECT explode(sequence(256, 4096)) AS h)"
    ).collect()
    for r in rows:
        q = r["h"] // sketch.M_REGS
        expect = (q & -q).bit_length() if q else sketch.RHO_MAX + 1
        assert r["rho"] == min(expect, sketch.RHO_MAX + 1), r["h"]


def test_histogram_quantile_ignores_nulls(spark):
    # NULLs must not be counted as low-edge values (ADVICE r3): the
    # quantile over [null x 50, 100.0 x 50] is the quantile of the 100s.
    rows = [("a", None)] * 50 + [("a", 100.0)] * 50
    df = spark.createDataFrame(rows, "k string, v double")
    got = sketch.histogram_quantile(df, ["k"], "v", 0.5, 0.0, 128.0).collect()
    assert got[0]["quantile"] == pytest.approx(100.0, abs=128.0 / 512)
    # oracle twin drops them identically
    import duckdb

    df.toPandas().to_parquet("/tmp/_hq_nulls.parquet")
    con = duckdb.connect()
    con.execute("CREATE VIEW t AS SELECT * FROM '/tmp/_hq_nulls.parquet'")
    sql = sketch.histogram_quantile_sql(["k"], "v", "t", 0.5, 0.0, 128.0)
    assert con.execute(sql).fetchall()[0][1] == got[0]["quantile"]


# ---- count-min sketch ----


def test_cms_estimate_one_sided_and_tight(spark):
    # 500 distinct tokens, zipf-ish occurrence weights
    rows = [(f"tok{i}", 1 + (1000 // (i + 1))) for i in range(500)]
    df = spark.createDataFrame(rows, "tok string, occ int")
    sk = sketch.cms_sketch(df, [], "tok", weight="occ")
    probes = spark.createDataFrame(
        [("tok0",), ("tok7",), ("tok499",), ("absent",)], "term string"
    )
    est = {r["term"]: r["est_count"] for r in sketch.cms_estimate(sk, probes).collect()}
    true = dict(rows)
    total = sum(w for _, w in rows)
    for t in ("tok0", "tok7", "tok499"):
        assert est[t] >= true[t]  # CMS never under-estimates
        # standard bound: overshoot <= 2N/WIDTH with prob 1 - 2^-DEPTH;
        # generous factor for the tiny width
        assert est[t] <= true[t] + 4 * total / sketch.CMS_WIDTH
    assert est["absent"] <= 4 * total / sketch.CMS_WIDTH


def test_cms_merge_equals_whole(spark):
    df = spark.createDataFrame(
        [(i, f"w{i % 97}", 1) for i in range(4000)], "i int, tok string, occ int"
    )
    lo = df.filter("i % 2 = 0").drop("i")
    hi = df.filter("i % 2 = 1").drop("i")
    df = df.drop("i")
    merged = sketch.cms_merge(
        sketch.cms_sketch(lo, [], "tok", weight="occ"),
        sketch.cms_sketch(hi, [], "tok", weight="occ"),
    )
    whole = sketch.cms_sketch(df, [], "tok", weight="occ")
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))


def test_cms_state_is_bounded(spark):
    df = spark.range(50000).selectExpr("CAST(id AS STRING) AS tok")
    sk = sketch.cms_sketch(df, [], "tok")
    assert sk.count() <= sketch.CMS_DEPTH * sketch.CMS_WIDTH


def test_cms_no_python_in_plan(spark):
    df = spark.createDataFrame([("a", 1)], "tok string, occ int")
    sk = sketch.cms_sketch(df, [], "tok", weight="occ")
    probes = spark.createDataFrame([("a",)], "term string")
    plan = sketch.cms_estimate(sk, probes)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_cms_hash_parity_with_duckdb(spark):
    """Bucket-level cross-engine parity: estimates can match by luck on
    a collision-free vocab, so assert the HASHES agree (this is the test
    that catches 32-bit overflow divergence between engines)."""
    import duckdb

    toks = [f"tok-{i}" for i in range(64)] + ["", "a", "the quick brown fox"]
    df = spark.createDataFrame([(t,) for t in toks], "tok string")
    got = {
        (r["tok"], r["r"]): r["bucket"]
        for r in df.selectExpr(
            "tok",
            "posexplode(array({})) AS (r, bucket)".format(
                ", ".join(sketch.cms_bucket_sql("tok", k) for k in range(sketch.CMS_DEPTH))
            ),
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(tok VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(t,) for t in toks])
    for k in range(sketch.CMS_DEPTH):
        for tok, b in con.execute(
            f"SELECT tok, {sketch.cms_bucket_sql('tok', k)} FROM t"
        ).fetchall():
            assert got[(tok, k)] == b, (tok, k)
    assert all(0 <= b < sketch.CMS_WIDTH for b in got.values())


# --- Bloom membership sketch ------------------------------------------------


def _bloom_docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_bloom_no_false_negatives(spark):
    """Every value that went into the sketch must probe as a member."""
    vals = [f"value-{i}" for i in range(500)]
    df = spark.createDataFrame([(v,) for v in vals], "g string")
    bloom = sketch.bloom_build(df, "g")
    hits = sketch.bloom_probe(df, bloom, "g", keep=[]).collect()
    assert sorted(r["g"] for r in hits) == sorted(vals)


def test_bloom_fpr_bounded(spark):
    """Non-members rarely probe as members: with n=500, k=4, m=2^16 the
    analytic FPR is ~1e-6; allow a generous 1% before failing."""
    members = spark.createDataFrame(
        [(f"in-{i}",) for i in range(500)], "g string"
    )
    probes = spark.createDataFrame(
        [(f"out-{i}",) for i in range(2000)], "g string"
    )
    bloom = sketch.bloom_build(members, "g")
    fp = sketch.bloom_probe(probes, bloom, "g", keep=[]).count()
    assert fp <= 20


def test_bloom_merge_equals_whole(spark):
    """Position-set union is EXACT: merge(build(A), build(B)) must equal
    build(A ∪ B) row-for-row."""
    df = spark.range(3000).selectExpr("concat('v-', id) AS g")
    lo = df.filter(F.col("g").substr(-1, 1).isin("0", "2", "4", "6", "8"))
    hi = df.subtract(lo)
    merged = sketch.bloom_merge(
        sketch.bloom_build(lo, "g"), sketch.bloom_build(hi, "g")
    )
    whole = sketch.bloom_build(df, "g")
    assert sorted(r["pos"] for r in merged.collect()) == sorted(
        r["pos"] for r in whole.collect()
    )


def test_bloom_state_is_bounded(spark):
    """The sketch never exceeds BLOOM_BITS rows regardless of input size."""
    df = spark.range(300000).selectExpr("concat('x-', id) AS g")
    assert sketch.bloom_build(df, "g").count() <= sketch.BLOOM_BITS


def test_bloom_probe_plan_broadcasts_no_python(spark):
    """The probe is a narrow explode + BROADCAST join: the corpus side is
    never shuffled on the value, and no Python appears anywhere."""
    members = spark.createDataFrame([("m",)], "g string")
    probes = spark.createDataFrame([(0, "m")], "doc_id long, g string")
    out = sketch.bloom_probe(probes, sketch.bloom_build(members, "g"), "g")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan


def test_bloom_decontaminate_superset_of_exact(spark):
    """bloom_decontaminate flags every doc the exact screen flags, with
    per-doc bloom hit counts >= exact hit counts (one-sided error)."""
    from ocgis_spark.operators import text as textops

    bench_texts = [
        " ".join(f"b{j}w{i}" for i in range(40)) for j in range(5)
    ]
    leak = [t.split(" ", 3)[3] for t in bench_texts[:3]]
    clean = [" ".join(f"c{j}w{i}" for i in range(40)) for j in range(10)]
    bench = _bloom_docs(spark, bench_texts)
    train = _bloom_docs(spark, leak + clean)
    exact = {
        r["doc_id"]: r["n_hits"]
        for r in textops.decontaminate(train, bench, n=8).collect()
    }
    bloom = {
        r["doc_id"]: r["n_hits_bloom"]
        for r in textops.bloom_decontaminate(train, bench, n=8).collect()
    }
    assert set(exact) <= set(bloom)
    for d, n in exact.items():
        assert bloom[d] >= n
    # the three planted leaks are caught
    assert {0, 1, 2} <= set(bloom)


def test_bloom_probe_tolerates_duplicate_probe_rows(spark):
    """Regression (r4 review): a d-duplicated probe row explodes to d*K
    position rows; the hits==total rule must still report membership (a
    strict count == K dropped genuine members)."""
    members = spark.createDataFrame([("m",)], "g string")
    probes = spark.createDataFrame([("m",), ("m",), ("out",)], "g string")
    bloom = sketch.bloom_build(members, "g")
    hits = sketch.bloom_probe(probes, bloom, "g", keep=[])
    assert [r["g"] for r in hits.collect()] == ["m"]


def test_hll_sketch_drops_nulls(spark):
    """r4 review: NULL values hash to a NULL bucket that counted as a
    FILLED register (zeros off by one) — NULLs must not contribute to a
    distinct-count sketch."""
    rows = [(1, str(i)) for i in range(50)] + [(1, None)] * 5
    df = spark.createDataFrame(rows, "k int, v string")
    clean = spark.createDataFrame(rows[:50], "k int, v string")
    a = sketch.hll_estimate(sketch.hll_sketch(df, ["k"], "v"), ["k"]).collect()
    b = sketch.hll_estimate(sketch.hll_sketch(clean, ["k"], "v"), ["k"]).collect()
    assert a[0]["est_distinct"] == b[0]["est_distinct"]
