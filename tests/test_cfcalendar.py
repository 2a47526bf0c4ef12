"""CF calendar decode goldens (360_day / noleap / all_leap / months since)
— reference cftime handling, ``variable/temporal.py:201-225,783-822``."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from ocgis_spark.operators import cfcalendar as CF


def _decode(spark, offs, calendar, units):
    df = spark.createDataFrame(pd.DataFrame({"v": offs}))
    out = CF.decode_time(df, "v", calendar, units).orderBy("v").toPandas()
    return list(zip(out.cf_year, out.cf_month, out.cf_day, out.cf_doy))


def test_360_day_goldens(spark):
    got = _decode(spark, [-1, 0, 29, 30, 359, 360, 725],
                  "360_day", "days since 2000-01-01")
    assert got == [
        (1999, 12, 30, 360), (2000, 1, 1, 1), (2000, 1, 30, 30),
        (2000, 2, 1, 31), (2000, 12, 30, 360), (2001, 1, 1, 1),
        (2002, 1, 6, 6),
    ]


def test_noleap_goldens(spark):
    got = _decode(spark, [-1, 0, 58, 59, 364, 365],
                  "noleap", "days since 2000-01-01")
    assert got == [
        (1999, 12, 31, 365), (2000, 1, 1, 1), (2000, 2, 28, 59),
        (2000, 3, 1, 60),  # Feb 29 does not exist
        (2000, 12, 31, 365), (2001, 1, 1, 1),
    ]


def test_all_leap_goldens(spark):
    got = _decode(spark, [59, 60], "all_leap", "days since 2000-01-01")
    assert got == [(2000, 2, 29, 60), (2000, 3, 1, 61)]  # Feb 29 always


def test_nonstandard_base_date(spark):
    got = _decode(spark, [0, 20], "360_day", "days since 1850-02-11")
    assert got[0] == (1850, 2, 11, 41)
    assert got[1] == (1850, 3, 1, 61)


def test_months_since(spark):
    df = _decode_ms(spark, [-6, 0, 7], "months since 2000-06-15")
    assert df == [(1999, 12, 15), (2000, 6, 15), (2001, 1, 15)]


def _decode_ms(spark, offs, units):
    df = spark.createDataFrame(pd.DataFrame({"v": offs}))
    out = CF.decode_time(df, "v", "standard", units).orderBy("v").toPandas()
    return list(zip(out.cf_year, out.cf_month, out.cf_day))


def test_cf_time_region(spark):
    df = spark.createDataFrame(pd.DataFrame({"v": list(range(0, 721))}))
    out = CF.cf_time_region(
        df, "v", "360_day", "days since 2000-01-01", months=[2], years=[2001]
    ).toPandas()
    assert len(out) == 30
    assert set(out.cf_year) == {2001} and set(out.cf_month) == {2}


def test_decode_exprs_run_in_duckdb():
    """The same expression strings must run verbatim in DuckDB."""
    import duckdb

    ex = CF.decode_exprs("v", "noleap", "days since 2000-01-01")
    row = duckdb.sql(
        f"SELECT {ex['cf_year']} AS y, {ex['cf_month']} AS m, "
        f"{ex['cf_day']} AS d, {ex['cf_doy']} AS doy FROM (SELECT 59 AS v)"
    ).fetchone()
    assert row == (2000, 3, 1, 60)


from hypothesis import given, settings
from hypothesis import strategies as st


@given(st.integers(min_value=-200_000, max_value=200_000),
       st.sampled_from(["360_day", "noleap", "all_leap"]))
@settings(max_examples=80, deadline=None)
def test_decode_roundtrip_property(off, calendar):
    """Property: decode is a bijection — re-encoding (year, doy) returns
    the absolute day offset, and fields stay in range."""
    ex = CF.decode_exprs("v", calendar, "days since 2000-01-01")
    import duckdb

    y, m, d, doy = duckdb.sql(
        f"SELECT {ex['cf_year']}, {ex['cf_month']}, {ex['cf_day']}, "
        f"{ex['cf_doy']} FROM (SELECT {off} AS v)"
    ).fetchone()
    ylen = {"360_day": 360, "noleap": 365, "all_leap": 366}[calendar]
    assert 1 <= m <= 12 and d >= 1 and 1 <= doy <= ylen
    # re-encode: absolute day = (y - 2000)*ylen + doy - 1 must equal off
    assert (y - 2000) * ylen + doy - 1 == off
    if calendar == "360_day":
        assert d <= 30 and doy == (m - 1) * 30 + d
