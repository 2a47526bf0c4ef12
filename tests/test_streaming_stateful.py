"""applyInPandasWithState: state carried across MULTIPLE micro-batches
(maxFilesPerTrigger=1 over two staged files) matches the batch result."""

import shutil

from pyspark.sql import functions as F

from ocgis_spark.streaming.stateful import running_exceed_counts


def test_stateful_running_counts_across_batches(spark, tmp_path):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    # stage two files -> two micro-batches under maxFilesPerTrigger=1
    d = tmp_path / "ev_stream"
    d.mkdir()
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(
        str(d / "f0.parquet")
    )
    ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(
        str(d / "f1.parquet")
    )
    # flatten nested dirs into single files the stream source can watch
    staged = tmp_path / "ev_flat"
    staged.mkdir()
    for i, sub in enumerate(sorted(d.iterdir())):
        part = next(p for p in sub.iterdir() if p.name.endswith(".parquet"))
        shutil.copy(part, staged / f"batch{i}.parquet")

    schema = ev.schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(staged))
    )
    out = running_exceed_counts(stream, threshold=60.0)
    q = (
        out.writeStream.format("memory")
        .queryName("state_t")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # update mode appends one row per key per batch: the LAST row per key
    # is the final running count
    rows = spark.sql(
        "SELECT user_id, n_exceed FROM state_t"
    ).toPandas()
    final = rows.groupby("user_id")["n_exceed"].max()
    expected = (
        ev.filter(F.col("value") > 60.0)
        .groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
        .toPandas().set_index("user_id")["n"]
    )
    for uid, n in expected.items():
        assert final[uid] == n
    # state really spanned batches: some key must appear twice
    assert (rows.groupby("user_id").size() > 1).any()


def test_streaming_dedup_matches_batch(spark, tmp_path):
    """stream == batch: stateful dropDuplicates over micro-batches yields
    exactly the batch distinct-key count, regardless of batch boundaries."""
    import pandas as pd
    from pyspark.sql import functions as F

    from ocgis_spark.streaming import pipeline as P

    src = str(tmp_path / "src")
    # two files -> two micro-batches with cross-file duplicates
    docs1 = pd.DataFrame({"doc_id": range(0, 40),
                          "text": [f"doc body {i % 15} payload" for i in range(40)]})
    docs2 = pd.DataFrame({"doc_id": range(40, 80),
                          "text": [f"doc body {i % 25} payload" for i in range(40)]})
    spark.createDataFrame(docs1).coalesce(1).write.mode("overwrite").parquet(src)
    spark.createDataFrame(docs2).coalesce(1).write.mode("append").parquet(src)

    batch = spark.read.parquet(src)
    expected = (
        batch.withColumn("_dk", F.expr("lower(trim(substr(text, 1, 40)))"))
        .select("_dk").distinct().count()
    )

    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
    )
    out = P.streaming_dedup(stream)
    q = (
        out.writeStream.format("memory").queryName("dedup_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT count(*) AS n FROM dedup_stream").collect()[0]["n"]
    assert got == expected == 25


def test_streaming_hll_sketch_matches_batch(spark, tmp_path):
    """stream == batch: the (key, bucket) max registers drained from the
    stream equal the batch sketch bit-for-bit, so the estimate is the
    SAME number a batch job would publish."""
    import pandas as pd

    from ocgis_spark.operators import sketch as SK
    from ocgis_spark.streaming import pipeline as P

    src = str(tmp_path / "hll_src")
    d1 = pd.DataFrame({"lang": ["en"] * 30 + ["de"] * 10, "doc_id": range(40)})
    d2 = pd.DataFrame({"lang": ["en"] * 20 + ["de"] * 20, "doc_id": range(20, 60)})
    spark.createDataFrame(d1).coalesce(1).write.mode("overwrite").parquet(src)
    spark.createDataFrame(d2).coalesce(1).write.mode("append").parquet(src)

    batch = spark.read.parquet(src)
    expect = sorted(
        map(tuple, SK.hll_sketch(batch, ["lang"], "doc_id").collect())
    )

    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
    )
    out = P.streaming_hll_sketch(stream, ["lang"], "doc_id")
    P.run_available_now(out, "hll_stream", str(tmp_path / "ck_hll"))
    got = sorted(map(tuple, spark.sql("SELECT * FROM hll_stream").collect()))
    assert got == expect
    # and the estimates agree too (same registers -> same number)
    est_b = SK.hll_estimate(SK.hll_sketch(batch, ["lang"], "doc_id"), ["lang"])
    est_s = SK.hll_estimate(spark.table("hll_stream"), ["lang"])
    assert sorted(map(tuple, est_b.collect())) == sorted(map(tuple, est_s.collect()))


def test_streaming_cms_sketch_matches_batch(spark, tmp_path):
    """stream == batch for the count-min counters: sum-merge state drained
    from the stream equals the batch sketch bit-for-bit, so probe
    estimates are the SAME numbers a batch job would publish."""
    import pandas as pd

    from ocgis_spark.operators import sketch as SK
    from ocgis_spark.streaming import pipeline as P

    src = str(tmp_path / "cms_src")
    d1 = pd.DataFrame({"tok": [f"w{i % 13}" for i in range(40)]})
    d2 = pd.DataFrame({"tok": [f"w{i % 7}" for i in range(30)]})
    spark.createDataFrame(d1).coalesce(1).write.mode("overwrite").parquet(src)
    spark.createDataFrame(d2).coalesce(1).write.mode("append").parquet(src)

    batch = spark.read.parquet(src)
    expect = sorted(map(tuple, SK.cms_sketch(batch, [], "tok").collect()))

    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
    )
    out = P.streaming_cms_sketch(stream, [], "tok")
    P.run_available_now(out, "cms_stream", str(tmp_path / "ck_cms"))
    got = sorted(map(tuple, spark.sql("SELECT * FROM cms_stream").collect()))
    assert got == expect
    probes = spark.createDataFrame([("w0",), ("w5",), ("nope",)], "term string")
    est_b = SK.cms_estimate(SK.cms_sketch(batch, [], "tok"), probes)
    est_s = SK.cms_estimate(spark.table("cms_stream"), probes)
    assert sorted(map(tuple, est_b.collect())) == sorted(map(tuple, est_s.collect()))


def test_streaming_near_dup_hits_matches_batch(spark, tmp_path):
    """stream == batch: the stream-static LSH band screen flags exactly
    the docs the batch screen flags, across micro-batch boundaries."""
    import pandas as pd

    from ocgis_spark.operators import dedup as D
    from ocgis_spark.streaming import pipeline as P

    base = [
        "the quick brown fox jumps over the lazy dog again and again",
        "colorless green ideas sleep furiously in the long grass field",
        "a completely different document about spark physical planning",
        "yet another unrelated body of text with its own vocabulary",
    ]
    hist = pd.DataFrame({
        "doc_id": range(100, 104), "text": [t for t in base]
    })
    # probes: 0/1 duplicate history (deterministic all-band hit — the
    # probabilistic near-dup recall of the banding itself is covered by
    # the minhash oracle queries), 2/3 are novel
    probe1 = pd.DataFrame({
        "doc_id": [0, 2],
        "text": [base[0],
                 "nothing like anything indexed before, fresh content one"],
    })
    probe2 = pd.DataFrame({
        "doc_id": [1, 3],
        "text": [base[1],
                 "fresh content two, equally unlike the historical corpus"],
    })
    src = str(tmp_path / "probe_src")
    spark.createDataFrame(probe1).coalesce(1).write.mode("overwrite").parquet(src)
    spark.createDataFrame(probe2).coalesce(1).write.mode("append").parquet(src)

    index = D.lsh_band_index(spark.createDataFrame(hist)).persist()
    batch_probe = spark.read.parquet(src)
    expected = sorted(
        r["doc_id"] for r in D.near_dup_hits(batch_probe, index).collect()
    )
    assert expected == [0, 1]  # indexed copies hit, novel docs don't

    stream = (
        spark.readStream.schema(batch_probe.schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
    )
    out = P.streaming_near_dup_hits(stream, index)
    q = (
        out.writeStream.format("memory").queryName("ndh_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_ndh"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = sorted(
        r["doc_id"]
        for r in spark.sql("SELECT doc_id FROM ndh_stream").collect()
    )
    assert got == expected
    index.unpersist()


def test_streaming_near_dup_hits_watermarked(spark, tmp_path):
    """event_time + watermark bounds the hit-id dedup state
    (dropDuplicatesWithinWatermark) without changing the drained result."""
    import datetime as dt

    import pandas as pd

    from ocgis_spark.operators import dedup as D

    base = "the quick brown fox jumps over the lazy dog again and again"
    hist = spark.createDataFrame(
        pd.DataFrame({"doc_id": [100], "text": [base]})
    )
    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    probe = pd.DataFrame({
        "doc_id": [0, 1],
        "text": [base, "entirely novel content with nothing indexed"],
        "ts": [t0, t0 + dt.timedelta(minutes=1)],
    })
    src = str(tmp_path / "wm_src")
    spark.createDataFrame(probe).coalesce(1).write.mode("overwrite").parquet(src)
    index = D.lsh_band_index(hist).persist()
    batch_df = spark.read.parquet(src)
    # batch path with event_time: plain dropDuplicates, hit carries ts
    got_batch = D.near_dup_hits(batch_df, index, event_time="ts").collect()
    assert [r["doc_id"] for r in got_batch] == [0]
    stream = (
        spark.readStream.schema(batch_df.schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
    )
    out = D.near_dup_hits(stream, index, event_time="ts",
                          watermark_delay="5 minutes")
    q = (
        out.writeStream.format("memory").queryName("ndh_wm")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_wm"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT doc_id FROM ndh_wm").collect()
    assert [r["doc_id"] for r in got] == [0]
    index.unpersist()


def test_streaming_sessionize_matches_batch(spark, tmp_path):
    """stream == batch: per-event session labels from the
    applyInPandasWithState sessionizer equal the batch lag/cumsum
    labels, including sessions SPANNING a micro-batch boundary (state
    carries last_epoch/sid across batches)."""
    import datetime as dt

    import pandas as pd
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ocgis_spark.streaming import pipeline as P

    t0 = dt.datetime(2026, 3, 1, 9, 0, 0)

    def ev(uid, eid, minutes):
        return (uid, eid, t0 + dt.timedelta(minutes=minutes))

    # user 1: session A (0, 10 min), batch boundary, then 20 min (same
    # session — gap 10 min), then 120 min (new session).
    # user 2: one event per batch, 45-min gap -> two sessions.
    f1 = pd.DataFrame([ev(1, 10, 0), ev(1, 11, 10), ev(2, 20, 5)],
                      columns=["user_id", "event_id", "ts"])
    f2 = pd.DataFrame([ev(1, 12, 20), ev(1, 13, 140), ev(2, 21, 50)],
                      columns=["user_id", "event_id", "ts"])
    src = str(tmp_path / "sess_src")
    spark.createDataFrame(f1).coalesce(1).write.mode("overwrite").parquet(src)
    spark.createDataFrame(f2).coalesce(1).write.mode("append").parquet(src)

    batch = spark.read.parquet(src)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.col("ts").cast("timestamp").cast("long")
    gap = epoch - F.lag(epoch).over(w)
    expected = sorted(
        (r["user_id"], r["event_id"], r["session_id"])
        for r in batch.withColumn(
            "new_s", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
        ).withColumn(
            "session_id",
            F.sum("new_s").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ).cast("int"),
        ).select("user_id", "event_id", "session_id").collect()
    )
    assert expected == [(1, 10, 1), (1, 11, 1), (1, 12, 1), (1, 13, 2),
                        (2, 20, 1), (2, 21, 2)]

    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
    )
    out = P.streaming_sessionize(stream)
    q = (
        out.writeStream.format("memory").queryName("sess_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_sess"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["user_id"], r["event_id"], r["session_id"])
        for r in spark.sql(
            "SELECT user_id, event_id, session_id FROM sess_stream"
        ).collect()
    )
    assert got == expected


def test_streaming_bloom_sketch_matches_batch(spark, tmp_path):
    """stream == batch for the bloom position set: the distinct positions
    drained from the stream equal the batch sketch row-for-row, so a
    bloom_probe against the drained table gives the SAME membership
    verdicts a batch job would."""
    import pandas as pd

    from ocgis_spark.operators import sketch as SK
    from ocgis_spark.streaming import pipeline as P

    src = str(tmp_path / "bloom_src")
    d1 = pd.DataFrame({"g": [f"gram-{i}" for i in range(50)]})
    d2 = pd.DataFrame({"g": [f"gram-{i}" for i in range(30, 90)]})
    spark.createDataFrame(d1).coalesce(1).write.mode("overwrite").parquet(src)
    spark.createDataFrame(d2).coalesce(1).write.mode("append").parquet(src)

    batch = spark.read.parquet(src)
    expect = sorted(r["pos"] for r in SK.bloom_build(batch, "g").collect())

    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
    )
    out = P.streaming_bloom_sketch(stream, "g")
    P.run_available_now(out, "bloom_stream", str(tmp_path / "ck_bloom"))
    got = sorted(
        r["pos"] for r in spark.sql("SELECT * FROM bloom_stream").collect()
    )
    assert got == expect
    # membership verdicts agree: every ingested gram probes as a member
    # of the drained table
    hits = SK.bloom_probe(
        batch.distinct(), spark.table("bloom_stream"), "g", keep=[]
    )
    assert hits.count() == batch.distinct().count()


def test_streaming_domain_cap_across_batches(spark, tmp_path):
    """streaming_domain_cap admits exactly the first min(cap, n) docs per
    domain in (micro-batch, doc_id) order — verified against a Python
    replay of the admission rule over the two staged batches."""
    from ocgis_spark.operators import urls
    from ocgis_spark.streaming.stateful import streaming_domain_cap

    docs = spark.range(0, 400).select(
        F.col("id").alias("doc_id"),
        F.expr(urls.url_synth_sql("id")).alias("url"),
    )
    canon = urls.canonicalize(docs).select("doc_id", "domain")
    staged = tmp_path / "canon_flat"
    staged.mkdir()
    for i, pred in enumerate(
        [F.col("doc_id") < 200, F.col("doc_id") >= 200]
    ):
        d = tmp_path / f"b{i}"
        canon.filter(pred).coalesce(1).write.parquet(str(d))
        part = next(p for p in d.iterdir() if p.name.endswith(".parquet"))
        shutil.copy(part, staged / f"batch{i}.parquet")

    stream = (
        spark.readStream.schema("doc_id long, domain string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(staged))
    )
    out = streaming_domain_cap(stream, cap=30)
    q = (
        out.writeStream.format("memory")
        .queryName("dcap_t")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    admitted = spark.sql("SELECT doc_id, domain FROM dcap_t").toPandas()

    # Python replay: first min(cap, n) per domain in (batch, doc_id) order
    rows = canon.toPandas()
    rows["batch"] = (rows["doc_id"] >= 200).astype(int)
    expected = {}
    for dom, grp in rows.groupby("domain"):
        ordered = grp.sort_values(["batch", "doc_id"])["doc_id"].tolist()
        expected[dom] = set(ordered[:30])
    got = {
        dom: set(g["doc_id"].tolist())
        for dom, g in admitted.groupby("domain")
    }
    assert got == expected
    # the cap genuinely bit somewhere...
    assert any(len(v) == 30 for v in expected.values())
    # ...and state spanned micro-batches: some domain admitted docs from
    # BOTH staged files (i.e. its batch-0 rows did not fill the cap)
    assert any(
        any(d < 200 for d in v) and any(d >= 200 for d in v)
        for v in got.values()
    )


def test_streaming_cell_hotspots_matches_batch(spark, tmp_path):
    """The streaming hotspot feed equals the batch group-by on the same
    input (availableNow drain), including the min_count gate."""
    import ocgis_spark.fixtures as FX
    from ocgis_spark.operators.cluster import cell_id_sql
    from ocgis_spark.streaming import pipeline as P

    src = str(tmp_path / "ev_src")
    spark.read.parquet("/root/testdata/sf0.001/events.parquet") \
        .createOrReplaceTempView("events")
    ev = spark.sql(FX.events_geo_sql(
        ts_us="unix_micros(CAST(ts AS TIMESTAMP))"))
    geo = ev.withColumn(
        "ts", F.expr("timestamp_micros(ts_us)")
    ).select("event_id", "ts", "lon", "lat")
    geo.write.mode("overwrite").parquet(src)
    batch = spark.read.parquet(src)

    stream = spark.readStream.schema(batch.schema) \
        .option("maxFilesPerTrigger", 1).parquet(src)
    out = P.streaming_cell_hotspots(
        stream, cell_deg=10.0, window="2 days", watermark="1 hour",
        min_count=3,
    )
    assert out.isStreaming
    P.run_available_now(out, "cell_hot", str(tmp_path / "ck_hot"))
    got = sorted(map(tuple, spark.sql(
        "SELECT * FROM cell_hot").collect()))

    # batch twin: plain window group-by with the SAME cell arithmetic
    _, cx, cy = cell_id_sql(10.0)
    want_df = (
        batch.selectExpr("ts", f"{cx} AS cell_x", f"{cy} AS cell_y")
        .groupBy(F.window("ts", "2 days").alias("w"), "cell_x", "cell_y")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .filter(F.col("n") >= 3)
        .select(F.col("w.start").alias("w_start"),
                F.col("w.end").alias("w_end"),
                "cell_x", "cell_y", "n")
    )
    want = sorted(map(tuple, want_df.collect()))
    assert got == want and len(want) > 0
    # the gate really bites: some cells fall below it
    n_all = (
        batch.selectExpr("ts", f"{cx} AS cell_x", f"{cy} AS cell_y")
        .groupBy(F.window("ts", "2 days"), "cell_x", "cell_y").count()
    ).count()
    assert n_all > len(want)


def test_streaming_benford_matches_batch(spark, tmp_path):
    """stream == batch: the drained (d, c) state finalized with
    benford_finalize equals the batch screen bit-for-bit."""
    import pandas as pd

    from ocgis_spark.operators import text as TX
    from ocgis_spark.streaming import pipeline as P

    src = str(tmp_path / "bf_src")
    d1 = pd.DataFrame({"value": [1.2, 19.5, 0.034, 250.0, 0.0, 7.7]})
    d2 = pd.DataFrame({"value": [13.0, 1.9e4, -2.5, 0.9, 31.0, 4.04]})
    spark.createDataFrame(d1).coalesce(1).write.mode("overwrite").parquet(src)
    spark.createDataFrame(d2).coalesce(1).write.mode("append").parquet(src)

    batch = spark.read.parquet(src)
    expect = [tuple(r) for r in TX.benford_digits(batch, "value").collect()]

    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
    )
    out = P.streaming_benford(stream, "value")
    P.run_available_now(out, "bf_stream", str(tmp_path / "ck_bf"))
    got = [tuple(r) for r in TX.benford_finalize(
        spark.table("bf_stream")).collect()]
    assert got == expect
