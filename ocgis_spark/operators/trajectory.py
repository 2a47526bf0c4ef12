"""Per-entity trajectory statistics over geo-located event streams.

The reference's temporal machinery acts on gridded series; it has no
per-entity track family. This module adds the rollup a geospatial event
pipeline serves (fleet tracks, user mobility, buoy drift): order each
entity's points, measure consecutive geodesic steps, and aggregate to
one row per entity. Geodesic distance is the SAME dialect-shared
haversine as the radius/kNN family (``crs.haversine_m_sql``, reference
Spherical radius — src/ocgis/variable/crs.py:803), so engine and DuckDB
oracle evaluate one expression tree and agree to millimeters.

100-TB posture: ONE hash exchange on the entity key — the lag window,
the full-frame first/last window, and the per-entity aggregate all share
``hashpartitioning(entity)``, so Catalyst plans a single Exchange (plan-
asserted in pytest). No self-join, no collect; per-partition cost is the
window sort, bounded by per-entity track length. A pathological single
entity with billions of points is the one skew case — split such tracks
upstream (by day) and merge stats, exactly like any sessionization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .crs import haversine_m_sql

#: millimeter rounding — the geodesic-family parity contract (libm drift
#: between Spark and DuckDB is ~1e-9 relative; mm rounding absorbs it)
_ND = 3


def track_stats(
    df: DataFrame,
    entity: str = "user_id",
    ts_us: str = "ts_us",
    seq: str = "event_id",
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """One row per entity: point count, total geodesic track length,
    net (first→last) displacement, longest single step, and duration.

    Ordering is (ts_us, seq) — the tie-break column makes the walk
    deterministic when timestamps collide, which `length_m` requires
    (different orders walk different paths).

    Returns (entity, n_points BIGINT, length_m, net_m, max_step_m —
    all round(·, 3) meters — duration_us BIGINT).
    """
    w = Window.partitionBy(entity).orderBy(ts_us, seq)
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    step = F.expr(haversine_m_sql("plon", "plat", lon, lat))
    stepped = df.select(
        entity,
        F.col(ts_us).alias("_us"),
        F.lag(lon).over(w).alias("plon"),
        F.lag(lat).over(w).alias("plat"),
        F.col(lon).alias(lon),
        F.col(lat).alias(lat),
        F.first(lon).over(wf).alias("flon"),
        F.first(lat).over(wf).alias("flat"),
        F.last(lon).over(wf).alias("llon"),
        F.last(lat).over(wf).alias("llat"),
    ).select(
        entity, "_us", "flon", "flat", "llon", "llat",
        F.when(F.col("plon").isNull(), F.lit(0.0)).otherwise(step)
        .alias("_step"),
    )
    agg = stepped.groupBy(entity).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_points"),
        F.round(F.sum("_step"), _ND).alias("length_m"),
        F.round(F.max("_step"), _ND).alias("max_step_m"),
        (F.max("_us") - F.min("_us")).cast("bigint").alias("duration_us"),
        # first/last are constant within the entity; min() is just the
        # deterministic way to carry them through the aggregate
        F.min("flon").alias("flon"), F.min("flat").alias("flat"),
        F.min("llon").alias("llon"), F.min("llat").alias("llat"),
    )
    net = F.expr(haversine_m_sql("flon", "flat", "llon", "llat"))
    return agg.select(
        entity, "n_points", "length_m",
        F.round(net, _ND).alias("net_m"),
        "max_step_m", "duration_us",
    )


def track_stats_sql(
    src_sql: str,
    entity: str = "user_id",
    ts_us: str = "ts_us",
    seq: str = "event_id",
    lon: str = "lon",
    lat: str = "lat",
) -> str:
    """Oracle twin of :func:`track_stats` — full window/aggregate replay
    in one dialect-shared string (DuckDB and Spark both accept the
    WINDOW clause and full-frame first_value/last_value)."""
    hav_step = haversine_m_sql("plon", "plat", lon, lat)
    hav_net = haversine_m_sql("flon", "flat", "llon", "llat")
    order = f"PARTITION BY {entity} ORDER BY {ts_us}, {seq}"
    return (
        f"WITH o AS (SELECT {entity}, {ts_us} AS _us, {lon}, {lat}, "
        f"lag({lon}) OVER w AS plon, lag({lat}) OVER w AS plat, "
        f"first_value({lon}) OVER wf AS flon, "
        f"first_value({lat}) OVER wf AS flat, "
        f"last_value({lon}) OVER wf AS llon, "
        f"last_value({lat}) OVER wf AS llat "
        f"FROM ({src_sql}) s "
        f"WINDOW w AS ({order}), "
        f"wf AS ({order} ROWS BETWEEN UNBOUNDED PRECEDING AND "
        f"UNBOUNDED FOLLOWING)), "
        f"st AS (SELECT {entity}, _us, flon, flat, llon, llat, "
        f"CASE WHEN plon IS NULL THEN 0.0E0 ELSE {hav_step} END AS _step "
        f"FROM o), "
        f"agg AS (SELECT {entity}, CAST(count(*) AS BIGINT) AS n_points, "
        f"round(sum(_step), {_ND}) AS length_m, "
        f"round(max(_step), {_ND}) AS max_step_m, "
        f"CAST(max(_us) - min(_us) AS BIGINT) AS duration_us, "
        f"min(flon) AS flon, min(flat) AS flat, "
        f"min(llon) AS llon, min(llat) AS llat "
        f"FROM st GROUP BY {entity}) "
        f"SELECT {entity}, n_points, length_m, "
        f"round({hav_net}, {_ND}) AS net_m, max_step_m, duration_us "
        f"FROM agg"
    )
