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
