"""CSV driver and time_subset_func coverage."""

import datetime as dt

from pyspark.sql import functions as F

from ocgis_spark.operators import temporal
from ocgis_spark.request import RequestDataset


def test_csv_driver_roundtrip(spark, tmp_path):
    p = str(tmp_path / "csvsrc")
    df = spark.createDataFrame(
        [(i, float(i) * 1.5) for i in range(20)], "id bigint, value double"
    )
    df.write.option("header", True).mode("overwrite").csv(p)
    rd = RequestDataset(uri=p, driver="csv")
    fld = rd.get(spark)
    assert fld.df.count() == 20
    assert dict(fld.df.dtypes)["value"] == "double"  # inferSchema


def test_time_subset_func(spark):
    rows = [(i, dt.datetime(2000, 3, 1) + dt.timedelta(days=i)) for i in range(30)]
    df = spark.createDataFrame(rows, "id int, ts timestamp")
    # arbitrary python predicate: keep Mondays (weekday 0)
    out = temporal.time_subset_func(df, lambda s: s.dt.weekday == 0)
    days = sorted(r.ts.day for r in out.collect())
    # March 2000 Mondays: 6, 13, 20, 27
    assert days == [6, 13, 20, 27]
