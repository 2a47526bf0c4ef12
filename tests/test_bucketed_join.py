"""Bucketed tables -> co-located (exchange-free) joins.

The 100 TB pattern for repeated joins on the same key (cell_id): write both
sides bucketed by the join key; Spark's bucketed scan then hash-joins
WITHOUT any shuffle exchange. This is the persistent-layout counterpart of
`repartition()` (SURVEY.md §4: partitioning & shuffle control)."""

import pytest
from pyspark.sql import functions as F

from ocgis_spark.fixtures import register_docs_geo

SF = "/root/testdata/sf0.001"


def test_bucketed_join_has_no_shuffle(spark):
    dg = register_docs_geo(spark, SF)
    spark.sql("DROP TABLE IF EXISTS docs_bucketed")
    spark.sql("DROP TABLE IF EXISTS cellstats_bucketed")
    (
        dg.select("doc_id", "cell_id", "value")
        .write.bucketBy(8, "cell_id").sortBy("cell_id")
        .mode("overwrite").saveAsTable("docs_bucketed")
    )
    (
        dg.groupBy("cell_id").agg(F.avg("value").alias("cell_mean"))
        .write.bucketBy(8, "cell_id").sortBy("cell_id")
        .mode("overwrite").saveAsTable("cellstats_bucketed")
    )
    a = spark.table("docs_bucketed")
    b = spark.table("cellstats_bucketed")
    # disable auto-broadcast so the join would otherwise need a shuffle
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, "cell_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # bucketed scans align: SortMergeJoin with NO ShuffleExchange
        assert "Exchange" not in plan or "REQUIRED_BY_STATEFUL" in plan, plan[:2000]
        n = joined.count()
        assert n == dg.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS docs_bucketed")
        spark.sql("DROP TABLE IF EXISTS cellstats_bucketed")
