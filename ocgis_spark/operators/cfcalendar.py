"""CF / cftime calendar support: 360_day, noleap (365_day), all_leap
(366_day), and "months since" units — pure column arithmetic.

Reference: ``/root/reference/src/ocgis/util/units.py`` usage plus
``variable/temporal.py:201-225`` (calendar attribute handling) and
``temporal.py:783-822`` (cftime value decoding). Any CMIP-style dataset
with a 360-day or no-leap calendar cannot be represented as proleptic-
Gregorian timestamps; the Spark-first representation keeps the RAW numeric
time coordinate and decodes (year, month, day, doy) with closed-form
integer arithmetic.

Every decode is built as a dialect-neutral SQL string (floor / CASE / %
/ CAST only) consumed BOTH by the Spark engine (``F.expr``) and by the
DuckDB oracle — parity is by construction (CLAUDE.md oracle discipline).
Negative offsets (dates before the units epoch) use floor-division
semantics, identical in both dialects via explicit ``floor(a / b)``.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: cumulative month-start day-of-year (0-based) per calendar
_CUM = {
    "noleap": [0, 31, 59, 90, 120, 151, 181, 212, 243, 273, 304, 334],
    "all_leap": [0, 31, 60, 91, 121, 152, 182, 213, 244, 274, 305, 335],
}
_YEAR_LEN = {"360_day": 360, "noleap": 365, "365_day": 365,
             "all_leap": 366, "366_day": 366}
_ALIASES = {"365_day": "noleap", "366_day": "all_leap"}

_UNITS_RE = re.compile(
    r"^(days|months)\s+since\s+(\d{1,4})-(\d{1,2})-(\d{1,2})"
)


def parse_units(units: str) -> tuple[str, int, int, int]:
    m = _UNITS_RE.match(units.strip())
    if not m:
        raise ValueError(f"unsupported CF time units {units!r}")
    kind, y, mo, d = m.group(1), int(m.group(2)), int(m.group(3)), int(m.group(4))
    return kind, y, mo, d


def _fdiv(a: str, b: int) -> str:
    """Floor division as dialect-neutral SQL (handles negatives)."""
    return f"CAST(floor(CAST({a} AS DOUBLE) / {b}) AS BIGINT)"


def decode_exprs(col: str, calendar: str, units: str) -> dict[str, str]:
    """SQL expressions decoding numeric ``col`` (offset in ``units`` from
    the base date, under ``calendar``) into cf_year / cf_month / cf_day /
    cf_doy. Runs verbatim in Spark SQL and DuckDB."""
    kind, y0, m0, d0 = parse_units(units)
    cal = _ALIASES.get(calendar, calendar)

    if kind == "months":
        absm = f"({y0} * 12 + {m0 - 1} + CAST({col} AS BIGINT))"
        year = _fdiv(absm, 12)
        month = f"CAST(({absm}) - ({year}) * 12 + 1 AS INT)"
        return {
            "cf_year": f"CAST({year} AS INT)",
            "cf_month": month,
            "cf_day": f"CAST({d0} AS INT)",
            "cf_doy": f"CAST(NULL AS INT)",
        }

    if cal == "360_day":
        base = y0 * 360 + (m0 - 1) * 30 + (d0 - 1)
        absd = f"({base} + CAST({col} AS BIGINT))"
        year = _fdiv(absd, 360)
        doy0 = f"(({absd}) - ({year}) * 360)"
        return {
            "cf_year": f"CAST({year} AS INT)",
            "cf_month": f"CAST({_fdiv(doy0, 30)} + 1 AS INT)",
            "cf_day": f"CAST(({doy0}) % 30 + 1 AS INT)",
            "cf_doy": f"CAST(({doy0}) + 1 AS INT)",
        }

    if cal in _CUM:
        cum = _CUM[cal]
        ylen = _YEAR_LEN[cal]
        base = y0 * ylen + cum[m0 - 1] + (d0 - 1)
        absd = f"({base} + CAST({col} AS BIGINT))"
        year = _fdiv(absd, ylen)
        doy0 = f"(({absd}) - ({year}) * {ylen})"
        month_cases = " ".join(
            f"WHEN ({doy0}) < {cum[i]} THEN {i}" for i in range(1, 12)
        )
        month = f"(CASE {month_cases} ELSE 12 END)"
        day_cases = " ".join(
            f"WHEN {month} = {i} THEN ({doy0}) - {cum[i - 1]} + 1"
            for i in range(1, 13)
        )
        return {
            "cf_year": f"CAST({year} AS INT)",
            "cf_month": f"CAST({month} AS INT)",
            "cf_day": f"CAST(CASE {day_cases} END AS INT)",
            "cf_doy": f"CAST(({doy0}) + 1 AS INT)",
        }
    raise ValueError(f"unsupported calendar {calendar!r}")


def decode_time(
    df: DataFrame, col: str, calendar: str, units: str
) -> DataFrame:
    """Attach cf_year/cf_month/cf_day/cf_doy — pure Catalyst arithmetic
    (whole-stage codegen, zero shuffle, no timestamp type involved)."""
    out = df
    for name, expr in decode_exprs(col, calendar, units).items():
        out = out.withColumn(name, F.expr(expr))
    return out


def cf_time_region(
    df: DataFrame,
    col: str,
    calendar: str,
    units: str,
    months: list[int] | None = None,
    years: list[int] | None = None,
    days: list[int] | None = None,
) -> DataFrame:
    """``time_region`` on a CF-calendar axis (reference
    ``temporal.py:345-378`` semantics, calendar-aware)."""
    out = decode_time(df, col, calendar, units)
    if months:
        out = out.filter(F.col("cf_month").isin([int(m) for m in months]))
    if years:
        out = out.filter(F.col("cf_year").isin([int(y) for y in years]))
    if days:
        out = out.filter(F.col("cf_day").isin([int(d) for d in days]))
    return out


def cf_daily_perc(
    df: DataFrame,
    col: str,
    calendar: str,
    units: str,
    percentile: float = 0.9,
    window: int = 5,
    value: str = "value",
) -> DataFrame:
    """Day-of-year percentile basis on a CF-calendar axis — the
    calendar-aware form of ``temporal.daily_perc`` (``statistics.py:
    138-352``): each row contributes to the 2w+1 doy bins around its own
    calendar doy, wrapping at the calendar's year length (360/365/366)
    instead of 365. One shuffle, no self-join."""
    assert window % 2 == 1
    half = window // 2
    cal = _ALIASES.get(calendar, calendar)
    ylen = _YEAR_LEN[cal]
    dec = decode_time(df, col, calendar, units)
    contrib = dec.select(
        F.explode(F.sequence(F.lit(-half), F.lit(half))).alias("off"),
        F.col("cf_doy").alias("doy"),
        F.col(value).alias("v"),
    ).select(
        ((F.col("doy") - 1 + F.col("off") + ylen) % ylen + 1).alias("basis_doy"),
        "v",
    )
    return contrib.groupBy("basis_doy").agg(
        F.percentile("v", F.lit(float(percentile))).alias("perc")
    )
