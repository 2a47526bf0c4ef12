"""Hand-computable fixtures for the round-3 ICCLIM tail: WSDI/CSDI spell
duration, the R{75,95,99}p precip-percentile family, and the simple
statistic indices (TG/TX/TXx/TNn/SD*) — reference
contrib/library_icclim.py:17-61."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from ocgis_spark.operators import calc_registry as CR
from ocgis_spark.operators import temporal


@pytest.fixture(scope="module")
def daily_series(spark):
    """One user, 20 consecutive days. Values: a 7-day warm spell
    (days 5..11 = 100.0) in a baseline of 10.0, plus a 3-day spell
    (days 15..17 = 100.0)."""
    rows = []
    for d in range(20):
        ts = dt.datetime(2024, 1, 1) + dt.timedelta(days=d)
        v = 100.0 if (4 <= d <= 10 or 14 <= d <= 16) else 10.0
        rows.append((1, d, ts, v))
    return spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, ts timestamp, value double"
    )


def test_wsdi_counts_spell_days_only(spark, daily_series):
    # constant basis at 50.0 for every doy → exceed exactly on the 100s
    basis = spark.createDataFrame(
        [(d, 50.0) for d in range(1, 367)], "basis_doy int, perc double"
    )
    out = CR.get("icclim_WSDI")(
        daily_series, ["user_id"], value="value", ts="ts", basis=basis,
        min_len=6,
    ).collect()
    # only the 7-day spell qualifies (3-day spell < 6)
    assert len(out) == 1 and out[0]["WSDI"] == 7

    out2 = CR.get("icclim_WSDI")(
        daily_series, ["user_id"], value="value", ts="ts", basis=basis,
        min_len=3,
    ).collect()
    assert out2[0]["WSDI"] == 10  # 7 + 3


def test_csdi_is_below_threshold(spark, daily_series):
    basis = spark.createDataFrame(
        [(d, 50.0) for d in range(1, 367)], "basis_doy int, perc double"
    )
    out = CR.get("icclim_CSDI")(
        daily_series, ["user_id"], value="value", ts="ts", basis=basis,
        min_len=4,
    ).collect()
    # below-50 runs: days 0..3 (4), 11..13 (3), 17..19 (3) → only the 4-run
    assert len(out) == 1 and out[0]["CSDI"] == 4


def test_r95p_family(spark):
    # 20 wet days 1..20 mm + 5 dry days (0.1 mm, excluded from basis)
    rows = [(1, i, float(i + 1)) for i in range(20)]
    rows += [(1, 100 + i, 0.1) for i in range(5)]
    df = spark.createDataFrame(rows, "user_id bigint, event_id bigint, value double")
    r95 = CR.get("icclim_R95p")(df, ["user_id"]).collect()[0]
    # 95th pct of 1..20 = 19.05 → only 20.0 exceeds
    assert r95["R95p"] == 1
    tot = CR.get("icclim_R95pTOT")(df, ["user_id"]).collect()[0]
    assert tot["R95pTOT"] == pytest.approx(100.0 * 20.0 / 210.0, abs=1e-6)
    r75 = CR.get("icclim_R75p")(df, ["user_id"]).collect()[0]
    # 75th pct = 15.25 → 16..20 exceed
    assert r75["R75p"] == 5


def test_simple_stat_indices(spark):
    rows = [
        (1, 10.0, 20.0, 5.0),
        (1, 12.0, 26.0, 0.5),
        (1, 8.0, 18.0, 60.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, value double, tasmax double, tasmin double"
    )
    assert CR.get("icclim_TG")(df, ["user_id"]).collect()[0]["TG"] == pytest.approx(10.0)
    assert CR.get("icclim_TXx")(df, ["user_id"]).collect()[0]["TXx"] == 26.0
    assert CR.get("icclim_TXn")(df, ["user_id"]).collect()[0]["TXn"] == 18.0
    assert CR.get("icclim_TNx")(df, ["user_id"]).collect()[0]["TNx"] == 60.0
    assert CR.get("icclim_TNn")(df, ["user_id"]).collect()[0]["TNn"] == 0.5
    assert CR.get("icclim_SD1")(df, ["user_id"]).collect()[0]["SD1"] == 3
    assert CR.get("icclim_SD5cm")(df, ["user_id"]).collect()[0]["SD5cm"] == 3
    assert CR.get("icclim_SD50cm")(df, ["user_id"]).collect()[0]["SD50cm"] == 0


def test_full_battery_registered():
    """45/45 active indices from the reference map (CD/CW/WD/WW are
    commented out upstream, contrib/library_icclim.py:62-65)."""
    icclim = [k for k in CR.registry() if k.startswith("icclim_")]
    assert len(icclim) == 45


def test_percentile_index_keeps_leap_day_366(spark):
    """r4 review: the doy-percentile probe join must wrap doy 366 -> 1
    (the same rule the basis uses). A raw dayofyear probe finds no basis
    row for Dec 31 of a leap year and the inner join silently DROPS it
    from TX90p/WSDI-family counts."""
    import datetime as dt

    rows = []
    # 10 ordinary days (value 1.0) early Jan + Dec 31 2020 (doy 366) hot
    for i in range(10):
        rows.append((1, i, dt.datetime(2020, 1, 1 + i), 1.0))
    rows.append((1, 99, dt.datetime(2020, 12, 31), 100.0))
    df = spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, ts timestamp, value double"
    )
    from ocgis_spark.operators import temporal

    basis = temporal.daily_perc(df, 0.9, window=5)
    out = CR.percentile_exceedance(
        df, ["user_id"], basis, direction="gt", out="n"
    ).collect()
    # Dec 31 (100.0) exceeds its wrapped basis bin; without the wrap the
    # row vanishes and the count misses it
    assert out and out[0]["n"] >= 1
    # every input row must survive the basis join (count parity)
    b = basis.select(
        CR.F.col("basis_doy").alias("_doy"),
        CR.F.round("perc", 6).alias("_perc"),
    )
    probe = (CR.F.dayofyear("ts").cast("int") + 364) % 365 + 1
    joined_n = df.join(CR.F.broadcast(b), probe == CR.F.col("_doy")).count()
    assert joined_n == df.count()
