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
from ..duckround import duck_round_sql

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


# ---- route proximity (point -> great-circle polyline distance) ----

def _seg_dist_sql(
    lon: str, lat: str,
    lon1: float, lat1: float, lon2: float, lat2: float,
    R: float,
) -> str:
    """Geodesic distance (meters, unrounded) from (lon, lat) to ONE
    great-circle segment, as a dialect-neutral SQL string (the aviation
    formulary cross-track/along-track construction). Per-segment
    constants — the segment's angular length d12 and initial bearing
    th12 — are folded driver-side into E-notation literals, so the
    per-row work is two haversines, one bearing atan2, and branch trig.

    The foot of the point on the great circle sits at signed arc
    position s* with cos(s*) = cos(d13)/cos(xt) and sign(s*) =
    sign(cos(dth)) (Napier: sin(s*)cos(xt) = sin(d13)cos(dth)) — valid
    for ALL d13, including past 90 degrees. Foot on the segment
    (cos(dth) > 0 AND |s*| <= d12) -> |xt|·R; otherwise the distance
    along the circle is monotone moving away from the foot, so the
    minimum over the arc is at an endpoint -> least(d13, d23). The
    textbook "behind p1 -> d13" shortcut is WRONG near the antipode
    (the foot wraps past it and p2 can be nearer — caught by the
    3D-vector reference in pytest); the min-endpoint clamp is exact
    everywhere. The CASE is CONTINUOUS across its branch boundary
    (at the along-track ends the cross-track distance equals the
    endpoint distance), so a 1-ulp libm difference between engines can
    flip the branch but moves the value only ~1 ulp — absorbed by the
    caller's mm rounding. asin/acos arguments are clamped (antipodal /
    90-degrees-off points can drift one ulp past the domain; a
    cos(xt)=0 division yields IEEE inf which the clamp maps to the
    correct pi/2 limit)."""
    import math

    from .crs import _pf

    d12, th12 = _seg_consts(lon1, lat1, lon2, lat2)
    d13_m = haversine_m_sql(_pf(lon1), _pf(lat1), lon, lat, R=R)
    d23_m = haversine_m_sql(_pf(lon2), _pf(lat2), lon, lat, R=R)
    th13 = (
        f"atan2(sin(radians(({lon}) - {_pf(lon1)})) * cos(radians({lat})), "
        f"{_pf(math.cos(math.radians(lat1)))} * sin(radians({lat})) - "
        f"{_pf(math.sin(math.radians(lat1)))} * cos(radians({lat})) * "
        f"cos(radians(({lon}) - {_pf(lon1)})))"
    )
    d13a = f"(({d13_m}) / {_pf(R)})"          # angular distance p1->p3
    dth = f"(({th13}) - {_pf(th12)})"
    xt = (f"asin(least(1.0E0, greatest(-1.0E0, "
          f"sin({d13a}) * sin({dth}))))")
    at = (f"acos(least(1.0E0, greatest(-1.0E0, "
          f"cos({d13a}) / cos({xt}))))")
    return (
        f"(CASE WHEN cos({dth}) > 0.0E0 AND ({at}) <= {_pf(d12)} "
        f"THEN abs({xt}) * {_pf(R)} "
        f"ELSE least(({d13_m}), ({d23_m})) END)"
    )


def _seg_consts(
    lon1: float, lat1: float, lon2: float, lat2: float,
) -> tuple:
    """(d12, th12): the segment's angular length and initial bearing —
    the driver-side constants every per-row expression folds in."""
    import math

    d12 = 2.0 * math.asin(math.sqrt(min(1.0, (
        math.sin(math.radians(lat2 - lat1) / 2.0) ** 2
        + math.cos(math.radians(lat1)) * math.cos(math.radians(lat2))
        * math.sin(math.radians(lon2 - lon1) / 2.0) ** 2
    ))))
    if d12 <= 0.0:
        raise ValueError(
            f"route segment has zero length at ({lon1}, {lat1}) — "
            f"consecutive waypoints must be distinct"
        )
    th12 = math.atan2(
        math.sin(math.radians(lon2 - lon1)) * math.cos(math.radians(lat2)),
        math.cos(math.radians(lat1)) * math.sin(math.radians(lat2))
        - math.sin(math.radians(lat1)) * math.cos(math.radians(lat2))
        * math.cos(math.radians(lon2 - lon1)),
    )
    return d12, th12


def _seg_pos_sql(
    lon: str, lat: str,
    lon1: float, lat1: float, lon2: float, lat2: float,
    R: float,
) -> str:
    """Along-segment arc position (RADIANS, clamped to [0, d12]) of the
    nearest segment point to (lon, lat) — the linear-referencing twin of
    :func:`_seg_dist_sql`, sharing its branch rule EXACTLY: foot on the
    segment (cos(dth) > 0 AND at <= d12) -> at; otherwise the nearest
    segment point is the endpoint `least(d13, d23)` picks, so the
    position snaps to 0 or d12 by the SAME d13 <= d23 comparison (a
    mismatch between the distance branch and the position branch would
    put the reported chainage at a point other than the nearest one)."""
    import math

    from .crs import _pf

    d12, th12 = _seg_consts(lon1, lat1, lon2, lat2)
    d13_m = haversine_m_sql(_pf(lon1), _pf(lat1), lon, lat, R=R)
    d23_m = haversine_m_sql(_pf(lon2), _pf(lat2), lon, lat, R=R)
    th13 = (
        f"atan2(sin(radians(({lon}) - {_pf(lon1)})) * cos(radians({lat})), "
        f"{_pf(math.cos(math.radians(lat1)))} * sin(radians({lat})) - "
        f"{_pf(math.sin(math.radians(lat1)))} * cos(radians({lat})) * "
        f"cos(radians(({lon}) - {_pf(lon1)})))"
    )
    d13a = f"(({d13_m}) / {_pf(R)})"
    dth = f"(({th13}) - {_pf(th12)})"
    xt = (f"asin(least(1.0E0, greatest(-1.0E0, "
          f"sin({d13a}) * sin({dth}))))")
    at = (f"acos(least(1.0E0, greatest(-1.0E0, "
          f"cos({d13a}) / cos({xt}))))")
    return (
        f"(CASE WHEN cos({dth}) > 0.0E0 AND ({at}) <= {_pf(d12)} "
        f"THEN ({at}) "
        f"WHEN ({d13_m}) <= ({d23_m}) THEN 0.0E0 "
        f"ELSE {_pf(d12)} END)"
    )


def route_distance_sql(
    route: list,
    lon: str = "lon",
    lat: str = "lat",
    R: float = None,
) -> str:
    """Min geodesic distance (meters, unrounded) from (lon, lat) to a
    polyline of (lon, lat) waypoints — `least` over the per-segment
    expressions. Wrap-safe: longitudes enter only through sin/cos of a
    delta, so seam-crossing segments need no pre-normalization. The
    route is driver-side constant data (like the kNN probe set): k
    waypoints fold into k-1 constant-laden expressions — a narrow
    codegen map over the corpus, 0 exchanges, nothing broadcast."""
    from .crs import R_SPHERE

    if R is None:
        R = R_SPHERE
    pts = [(float(a), float(b)) for a, b in route]
    if len(pts) < 2:
        raise ValueError("route needs at least 2 waypoints")
    segs = [
        _seg_dist_sql(lon, lat, x1, y1, x2, y2, R)
        for (x1, y1), (x2, y2) in zip(pts, pts[1:])
    ]
    return segs[0] if len(segs) == 1 else f"least({', '.join(segs)})"


def route_proximity(
    df: DataFrame,
    route: list,
    max_dist_m: float,
    lon: str = "lon",
    lat: str = "lat",
    out: str = "route_dist_m",
) -> DataFrame:
    """Rows within ``max_dist_m`` geodesic meters of the route polyline,
    with the distance (round(·,3) m — the geodesic-family parity
    contract) appended. One scan, no shuffle; the distance predicate is
    an ordinary filter Catalyst keeps next to the scan."""
    d = F.round(F.expr(route_distance_sql(route, lon, lat)), _ND)
    return df.withColumn(out, d).where(F.col(out) <= max_dist_m)


def route_proximity_sql(
    src_sql: str,
    route: list,
    max_dist_m: float,
    lon: str = "lon",
    lat: str = "lat",
    out: str = "route_dist_m",
) -> str:
    """Oracle twin of :func:`route_proximity` (same expression tree)."""
    from .crs import _pf

    d = route_distance_sql(route, lon, lat)
    return (
        f"SELECT * FROM (SELECT *, round({d}, {_ND}) AS {out} "
        f"FROM ({src_sql}) s) q WHERE {out} <= {_pf(float(max_dist_m))}"
    )


# ---- route linear referencing (nearest segment + chainage) ----

def _locate_parts(route: list, lon: str, lat: str, R: float):
    """Per-segment (dist_m unrounded, chainage_m unrounded) SQL strings
    plus the route's total length in meters. Chainage = the cumulative
    route offset of the segment start (driver-side constant) + the
    clamped along-segment position × R."""
    import math

    from .crs import R_SPHERE, _pf

    if R is None:
        R = R_SPHERE
    pts = [(float(a), float(b)) for a, b in route]
    if len(pts) < 2:
        raise ValueError("route needs at least 2 waypoints")
    dists, chains = [], []
    off = 0.0
    for (x1, y1), (x2, y2) in zip(pts, pts[1:]):
        d12, _ = _seg_consts(x1, y1, x2, y2)
        dists.append(_seg_dist_sql(lon, lat, x1, y1, x2, y2, R))
        pos = _seg_pos_sql(lon, lat, x1, y1, x2, y2, R)
        chains.append(f"({_pf(off)} + ({pos}) * {_pf(R)})")
        off += d12 * R
    return dists, chains, off


def route_locate(
    df: DataFrame,
    route: list,
    max_dist_m: float = None,
    lon: str = "lon",
    lat: str = "lat",
    R: float = None,
) -> DataFrame:
    """Linear referencing against a great-circle route polyline (the
    PostGIS ``ST_LineLocatePoint`` family, geodesic): appends

    * ``route_dist_m`` — min geodesic distance to the route (mm-rounded),
    * ``route_seg``    — 0-based index of the nearest segment,
    * ``route_pos_m``  — chainage: distance along the route of the
      nearest route point (mm-rounded; at a shared vertex both adjacent
      segments report the SAME chainage, so the first-min tie-break
      cannot move the value).

    Nearest segment = argmin over the MM-ROUNDED per-segment distances
    with a first-index tie-break — rounding before the argmin makes the
    branch choice engine-stable (unrounded doubles tie only up to libm's
    1-ulp drift, which rounding absorbs except at exact .5 mm
    boundaries, the accepted geodesic-family risk class). The per-row
    plan is one projection computing each segment's distance/chainage
    ONCE as a named column (a nested CASE over raw expressions would
    re-evaluate every segment O(k) times), then a `least` + CASE pick —
    a narrow codegen map, 0 exchanges. Optional ``max_dist_m`` is an
    ordinary filter Catalyst keeps at the scan."""
    dists, chains, _ = _locate_parts(route, lon, lat, R)
    n = len(dists)
    p = df.select(
        "*",
        *[F.round(F.expr(d), _ND).alias(f"_rl_d{i}")
          for i, d in enumerate(dists)],
        *[F.expr(c).alias(f"_rl_c{i}") for i, c in enumerate(chains)],
    )
    dcols = [F.col(f"_rl_d{i}") for i in range(n)]
    m = dcols[0] if n == 1 else F.least(*dcols)
    p = p.withColumn("_rl_m", m)
    if n == 1:
        seg = F.lit(0)
        chain = F.col("_rl_c0")
    else:
        seg = F.when(dcols[0] == F.col("_rl_m"), F.lit(0))
        chain = F.when(dcols[0] == F.col("_rl_m"), F.col("_rl_c0"))
        for i in range(1, n - 1):
            seg = seg.when(dcols[i] == F.col("_rl_m"), F.lit(i))
            chain = chain.when(
                dcols[i] == F.col("_rl_m"), F.col(f"_rl_c{i}"))
        seg = seg.otherwise(F.lit(n - 1))
        chain = chain.otherwise(F.col(f"_rl_c{n - 1}"))
    out = p.select(
        *df.columns,
        F.col("_rl_m").alias("route_dist_m"),
        seg.cast("int").alias("route_seg"),
        F.round(chain, _ND).alias("route_pos_m"),
    )
    if max_dist_m is not None:
        out = out.where(F.col("route_dist_m") <= float(max_dist_m))
    return out


def route_locate_sql(
    src_sql: str,
    route: list,
    max_dist_m: float = None,
    lon: str = "lon",
    lat: str = "lat",
    R: float = None,
) -> str:
    """Oracle twin of :func:`route_locate` — the same rounded-distance
    projection / least / first-match CASE as one dialect-shared string
    (Spark's `when`-chain with a final `otherwise` IS SQL's CASE with a
    final ELSE, so tie behavior matches by construction)."""
    from .crs import _pf

    dists, chains, _ = _locate_parts(route, lon, lat, R)
    n = len(dists)
    dsel = ", ".join(
        f"round({d}, {_ND}) AS _rl_d{i}" for i, d in enumerate(dists))
    csel = ", ".join(f"({c}) AS _rl_c{i}" for i, c in enumerate(chains))
    if n == 1:
        msql, seg, chain = "_rl_d0", "0", "_rl_c0"
    else:
        msql = f"least({', '.join(f'_rl_d{i}' for i in range(n))})"
        seg = " ".join(
            f"WHEN _rl_d{i} = _rl_m THEN {i}" for i in range(n - 1))
        seg = f"(CASE {seg} ELSE {n - 1} END)"
        chain = " ".join(
            f"WHEN _rl_d{i} = _rl_m THEN _rl_c{i}" for i in range(n - 1))
        chain = f"(CASE {chain} ELSE _rl_c{n - 1} END)"
    where = (
        f" WHERE route_dist_m <= {_pf(float(max_dist_m))}"
        if max_dist_m is not None else ""
    )
    return (
        f"SELECT * EXCLUDE ({', '.join(f'_rl_d{i}' for i in range(n))}, "
        f"{', '.join(f'_rl_c{i}' for i in range(n))}, _rl_m) FROM ("
        f"SELECT *, _rl_m AS route_dist_m, "
        f"CAST({seg} AS INTEGER) AS route_seg, "
        f"round({chain}, {_ND}) AS route_pos_m "
        f"FROM (SELECT *, {msql} AS _rl_m "
        f"FROM (SELECT *, {dsel}, {csel} FROM ({src_sql}) s) p) q) z{where}"
    )


# ---- dwell detection (stay points) ----

def _wrap_lon_sql(x: str) -> str:
    """Wrap a degree quantity into (-180, 180] — dialect-neutral (`%` on
    doubles is fmod in both engines; the +540 shift keeps the operand
    positive so fmod's sign convention never differs)."""
    return f"((({x}) + 540.0E0) % 360.0E0 - 180.0E0)"


def dwell_segments(
    df: DataFrame,
    max_step_m: float,
    min_duration_us: int = 0,
    entity: str = "user_id",
    ts_us: str = "ts_us",
    seq: str = "event_id",
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Stay-point detection: split each entity's (ts, seq)-ordered track
    wherever a consecutive geodesic step exceeds ``max_step_m``; each
    maximal run of small steps is a dwell segment. Returns one row per
    (entity, run) with point count, start/end/duration, and a WRAP-SAFE
    centroid: longitudes are averaged RELATIVE to the run's first point
    (wrapped into ±180°) and re-anchored, so a cluster straddling the
    antimeridian averages to ±180-ish, not to ~0. Segments shorter than
    ``min_duration_us`` are dropped (a single fix has duration 0).

    100-TB posture: the lag window, the run-id running sum and the
    anchor window all share ONE (entity, ts, seq) sort under ONE
    ``hashpartitioning(entity)`` exchange, and the final aggregate
    accepts the same partitioning — one exchange, ONE full-stream sort
    total (plan-asserted; the pre-r6 form paid three full sorts because
    the anchor was a (entity, run)-partitioned first_value whose
    ordering Spark cannot derive from the run-id cumsum). The anchor is
    instead the most recent break row's longitude — last_value
    (ignorenulls) over the shared sort — which IS the run's first row
    by construction: run_id increments exactly at _brk = 1 rows, so
    every run starts at its break row and downstream values are
    unchanged (with the fixtures' per-entity unique timestamps the
    per-group row order feeding the double averages is identical too,
    keeping them bit-exact; pinned by the dwell/od oracle rows and
    tests/test_trajectory.py).
    The step comparison runs on the MM-ROUNDED distance (engine-stable
    branch, the geodesic-family convention).
    """
    step = F.round(
        F.expr(haversine_m_sql("plon", "plat", lon, lat)), _ND)
    d0 = df.select(
        entity, F.col(ts_us).alias("_us"), F.col(seq).alias("_sq"),
        lon, lat,
    )
    w = Window.partitionBy(entity).orderBy("_us", "_sq")
    lagged = d0.select(
        entity, "_us", "_sq", lon, lat,
        F.lag(lon).over(w).alias("plon"),
        F.lag(lat).over(w).alias("plat"),
    ).select(
        entity, "_us", "_sq", lon, lat,
        F.when(F.col("plon").isNull() | (step > float(max_step_m)),
               F.lit(1)).otherwise(F.lit(0)).alias("_brk"),
    )
    # run_id keeps its original ORDER BY _us frame (the oracle's); its
    # required [entity, _us] ordering is a prefix of the shared
    # [entity, _us, _sq] sort, so no re-sort is inserted for either
    # window below.
    anchored = lagged.select(
        entity, "_us", lat, F.col(lon).alias("_lon"),
        F.sum("_brk").over(
            Window.partitionBy(entity).orderBy("_us").rowsBetween(
                Window.unboundedPreceding, Window.currentRow)
        ).cast("bigint").alias("run_id"),
        F.last(
            F.when(F.col("_brk") == 1, F.col(lon)), ignorenulls=True
        ).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("_anchor"),
    ).select(
        entity, "run_id", "_us", lat,
        F.expr(_wrap_lon_sql("_lon - _anchor")).alias("_rel"),
        "_anchor",
    )
    agg = anchored.groupBy(entity, "run_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_points"),
        F.min("_us").cast("bigint").alias("start_us"),
        F.max("_us").cast("bigint").alias("end_us"),
        (F.max("_us") - F.min("_us")).cast("bigint").alias("duration_us"),
        F.avg("_rel").alias("_avg_rel"),
        F.min("_anchor").alias("_a"),
        F.round(F.avg(lat), 6).alias("c_lat"),
    )
    c_lon = F.round(
        F.expr(_wrap_lon_sql("_a + _avg_rel")), 6).alias("c_lon")
    return agg.where(
        F.col("duration_us") >= int(min_duration_us)
    ).select(
        entity, "run_id", "n_points", "start_us", "end_us",
        "duration_us", c_lon, "c_lat",
    )


def dwell_segments_sql(
    src_sql: str,
    max_step_m: float,
    min_duration_us: int = 0,
    entity: str = "user_id",
    ts_us: str = "ts_us",
    seq: str = "event_id",
    lon: str = "lon",
    lat: str = "lat",
) -> str:
    """Oracle twin of :func:`dwell_segments` — the same lag / running-sum
    / first-value / aggregate cascade in one dialect-shared string."""
    from .crs import _pf

    hav = haversine_m_sql("plon", "plat", lon, lat)
    order = f"PARTITION BY {entity} ORDER BY {ts_us}, {seq}"
    rel = _wrap_lon_sql(f"{lon} - first_value({lon}) OVER wr")
    return (
        f"WITH o AS (SELECT {entity}, {ts_us} AS _us, {lon}, {lat}, "
        f"lag({lon}) OVER w AS plon, lag({lat}) OVER w AS plat "
        f"FROM ({src_sql}) s WINDOW w AS ({order})), "
        f"b AS (SELECT {entity}, _us, {lon}, {lat}, "
        f"CASE WHEN plon IS NULL OR round({hav}, {_ND}) > "
        f"{_pf(float(max_step_m))} THEN 1 ELSE 0 END AS _brk FROM o), "
        f"r AS (SELECT {entity}, _us, {lon}, {lat}, "
        f"CAST(sum(_brk) OVER (PARTITION BY {entity} ORDER BY _us "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) "
        f"AS run_id FROM b), "
        f"a AS (SELECT {entity}, run_id, _us, {lat}, "
        f"{rel} AS _rel, first_value({lon}) OVER wr AS _anchor "
        f"FROM r WINDOW wr AS (PARTITION BY {entity}, run_id "
        f"ORDER BY _us ROWS BETWEEN UNBOUNDED PRECEDING AND "
        f"CURRENT ROW)), "
        f"g AS (SELECT {entity}, run_id, "
        f"CAST(count(*) AS BIGINT) AS n_points, "
        f"CAST(min(_us) AS BIGINT) AS start_us, "
        f"CAST(max(_us) AS BIGINT) AS end_us, "
        f"CAST(max(_us) - min(_us) AS BIGINT) AS duration_us, "
        f"avg(_rel) AS _avg_rel, min(_anchor) AS _a, "
        f"round(avg({lat}), 6) AS c_lat "
        f"FROM a GROUP BY {entity}, run_id) "
        f"SELECT {entity}, run_id, n_points, start_us, end_us, "
        f"duration_us, round({_wrap_lon_sql('_a + _avg_rel')}, 6) "
        f"AS c_lon, c_lat "
        f"FROM g WHERE duration_us >= {int(min_duration_us)}"
    )


# ---- per-step kinematics (speed / bearing / GPS-jitter flags) ----

def _bearing_deg_sql(plon: str, plat: str, lon: str, lat: str) -> str:
    """Initial great-circle bearing (degrees in [0, 360)) from the
    previous point to the current one — dialect-neutral (atan2 yields
    (-180, 180]; the +360 %360 fold maps 360 -> 0 exactly). Wrap-safe:
    Δλ enters only under sin/cos."""
    dl = f"radians(({lon}) - ({plon}))"
    y = f"sin({dl}) * cos(radians({lat}))"
    x = (f"cos(radians({plat})) * sin(radians({lat})) - "
         f"sin(radians({plat})) * cos(radians({lat})) * cos({dl})")
    return f"((degrees(atan2({y}, {x})) + 360.0E0) % 360.0E0)"


def track_kinematics(
    df: DataFrame,
    vmax_mps: float = None,
    entity: str = "user_id",
    ts_us: str = "ts_us",
    seq: str = "event_id",
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Per-event kinematics over (ts, seq)-ordered entity tracks:

    * ``step_m``      — geodesic step from the previous fix (mm-rounded;
      NULL on each track's first fix),
    * ``dt_us``       — elapsed micros since the previous fix (BIGINT),
    * ``speed_mps``   — step_m / dt seconds, round(·,6); NULL when there
      is no previous fix or dt == 0 (coincident timestamps carry no rate
      information — dividing would yield ±inf),
    * ``bearing_deg`` — initial great-circle bearing from the previous
      fix, [0, 360), round(·,6),
    * ``implausible`` — speed_mps > ``vmax_mps`` (GPS-jitter screen:
      teleporting fixes; false when speed is NULL). Omitted when
      ``vmax_mps`` is None.

    The track-cleaning primitive: filter ``implausible`` fixes upstream
    of :func:`track_stats` / :func:`dwell_segments` so one bad fix does
    not split a dwell or inflate a track length. ONE exchange
    (hashpartitioning(entity)); everything else is a narrow map."""
    w = Window.partitionBy(entity).orderBy(ts_us, seq)
    lagged = df.select(
        "*",
        F.lag(lon).over(w).alias("_plon"),
        F.lag(lat).over(w).alias("_plat"),
        F.lag(ts_us).over(w).alias("_pus"),
    )
    step = F.round(
        F.expr(haversine_m_sql("_plon", "_plat", lon, lat)), _ND)
    dt = (F.col(ts_us) - F.col("_pus")).cast("bigint")
    speed = F.round(
        F.col("step_m") / (F.col("dt_us").cast("double") / 1.0e6), 6)
    bearing = F.round(
        F.expr(_bearing_deg_sql("_plon", "_plat", lon, lat)), 6)
    out = lagged.select(
        *df.columns,
        F.when(F.col("_plon").isNotNull(), step).alias("step_m"),
        F.when(F.col("_plon").isNotNull(), dt).alias("dt_us"),
        F.when(F.col("_plon").isNotNull(), bearing).alias("bearing_deg"),
    ).withColumn(
        "speed_mps",
        F.when(F.col("dt_us") > 0, speed),
    )
    if vmax_mps is not None:
        out = out.withColumn(
            "implausible",
            F.coalesce(F.col("speed_mps") > float(vmax_mps), F.lit(False)),
        )
    return out


def track_kinematics_sql(
    src_sql: str,
    vmax_mps: float = None,
    entity: str = "user_id",
    ts_us: str = "ts_us",
    seq: str = "event_id",
    lon: str = "lon",
    lat: str = "lat",
) -> str:
    """Oracle twin of :func:`track_kinematics` (same expression tree;
    the lag window replayed via a WINDOW clause)."""
    from .crs import _pf

    hav = haversine_m_sql("_plon", "_plat", lon, lat)
    bearing = _bearing_deg_sql("_plon", "_plat", lon, lat)
    order = f"PARTITION BY {entity} ORDER BY {ts_us}, {seq}"
    imp = (
        f", coalesce(speed_mps > {_pf(float(vmax_mps))}, FALSE) "
        f"AS implausible" if vmax_mps is not None else ""
    )
    return (
        f"SELECT * EXCLUDE (_plon, _plat, _pus){imp} FROM ("
        f"SELECT *, CASE WHEN dt_us > 0 THEN "
        f"round(step_m / (CAST(dt_us AS DOUBLE) / 1.0E6), 6) END "
        f"AS speed_mps FROM ("
        f"SELECT * EXCLUDE (step_m, dt_us, bearing_deg), "
        f"CASE WHEN _plon IS NOT NULL THEN step_m END AS step_m, "
        f"CASE WHEN _plon IS NOT NULL THEN dt_us END AS dt_us, "
        f"CASE WHEN _plon IS NOT NULL THEN bearing_deg END "
        f"AS bearing_deg FROM ("
        f"SELECT *, round({hav}, {_ND}) AS step_m, "
        f"CAST(({ts_us}) - _pus AS BIGINT) AS dt_us, "
        f"round({bearing}, 6) AS bearing_deg FROM ("
        f"SELECT *, lag({lon}) OVER w AS _plon, "
        f"lag({lat}) OVER w AS _plat, lag({ts_us}) OVER w AS _pus "
        f"FROM ({src_sql}) s WINDOW w AS ({order})) o) c) n) z"
    )


# ---- track resampling (great-circle interpolation to a time grid) ----

def _slerp_cols_sql() -> list:
    """The slerp cascade as (name, expr) stages over columns
    (plon, plat, lon, lat, f) — shared verbatim by engine and oracle.
    omega is the segment's angular distance (haversine with R=1);
    degenerate segments (sin(omega) ~ 0: coincident fixes, or the
    antipodal pair where the great circle is not unique) snap to the
    nearest endpoint by f — deterministic, and continuous at the
    omega->0 end (slerp of coincident points IS the point). The
    interpolated point is exactly unit-norm in exact arithmetic, so z
    is clamped only against 1-ulp drift."""
    # R=1: haversine_m_sql returns 2*R*asin(sqrt(h)); the angular
    # distance IS 2*asin(sqrt(h))
    omega = haversine_m_sql("plon", "plat", "lon", "lat", R=1.0)
    return [
        ("omega", omega),
        ("deg", "CASE WHEN sin(omega) < 1.0E-12 THEN 1 ELSE 0 END"),
        ("sa", "CASE WHEN deg = 1 THEN "
               "(CASE WHEN f <= 0.5E0 THEN 1.0E0 ELSE 0.0E0 END) "
               "ELSE sin((1.0E0 - f) * omega) / sin(omega) END"),
        ("sb", "CASE WHEN deg = 1 THEN "
               "(CASE WHEN f <= 0.5E0 THEN 0.0E0 ELSE 1.0E0 END) "
               "ELSE sin(f * omega) / sin(omega) END"),
        ("px", "sa * cos(radians(plat)) * cos(radians(plon)) + "
               "sb * cos(radians(lat)) * cos(radians(lon))"),
        ("py", "sa * cos(radians(plat)) * sin(radians(plon)) + "
               "sb * cos(radians(lat)) * sin(radians(lon))"),
        ("pz", "sa * sin(radians(plat)) + sb * sin(radians(lat))"),
    ]


_SLERP_LON = "round(degrees(atan2(py, px)), 6)"
_SLERP_LAT = (
    "round(degrees(asin(least(1.0E0, greatest(-1.0E0, pz)))), 6)"
)


def track_resample(
    df: DataFrame,
    interval_us: int,
    max_gap_us: int = None,
    entity: str = "user_id",
    ts_us: str = "ts_us",
    seq: str = "event_id",
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Resample each entity's track to a regular time grid: one row per
    tick k·``interval_us`` that falls inside a consecutive-fix segment
    (t_prev, t_cur], positioned by GREAT-CIRCLE interpolation (slerp) —
    f = (tick - t_prev)/(t_cur - t_prev); f = 1 reproduces the fix
    itself (to rounding), so a fix ON a tick is emitted exactly once.
    A track's FIRST fix is emitted iff it lands on a tick (no earlier
    segment covers it). Output: (entity, tick_us, lon, lat,
    interpolated) with coordinates round(·, 6) degrees.

    ``max_gap_us``: segments longer than this emit NO ticks —
    interpolating across a data gap fabricates fixes (a ship "sailing"
    through land for a week); refusing is standard trajectory-tool
    semantics, and it also bounds the explode fan-out per row. None =
    no limit (callers own the fan-out).

    Tick indices use exact integer arithmetic ((t - t % D)/D — epoch
    micros exceed 2^50, naive floor(t/D) on DOUBLE can mis-floor at
    exact multiples). Wrap-safe: the slerp runs in 3-space. One
    exchange (the lag window); the explode fans out tick rows AFTER the
    per-segment constants are computed, so per-tick work is the slerp
    trig only."""
    D = int(interval_us)
    if D <= 0:
        raise ValueError(f"interval_us must be positive, got {interval_us}")
    w = Window.partitionBy(entity).orderBy(ts_us, seq)
    pairs = df.select(
        entity,
        F.col(ts_us).alias("_us"),
        F.col(lon).alias("lon"), F.col(lat).alias("lat"),
        F.lag(ts_us).over(w).alias("_pus"),
        F.lag(lon).over(w).alias("plon"),
        F.lag(lat).over(w).alias("plat"),
    )
    starts = pairs.filter(
        F.col("_pus").isNull() & (F.col("_us") % D == 0)
    ).select(
        entity,
        F.col("_us").alias("tick_us"),
        F.round("lon", 6).alias("lon"),
        F.round("lat", 6).alias("lat"),
        F.lit(False).alias("interpolated"),
    )
    gap_ok = (
        (F.col("_us") - F.col("_pus")) <= int(max_gap_us)
        if max_gap_us is not None else F.lit(True)
    )
    segs = pairs.filter(
        F.col("_pus").isNotNull() & (F.col("_us") > F.col("_pus")) & gap_ok
    ).selectExpr(
        entity, "_pus", "_us", "plon", "plat", "lon", "lat",
        f"(_pus - (_pus % {D})) / {D} + 1 AS _klo",
        f"(_us - (_us % {D})) / {D} AS _khi",
    ).filter(F.col("_khi") >= F.col("_klo")).selectExpr(
        entity, "_pus", "_us", "plon", "plat", "lon", "lat",
        f"explode(sequence(CAST(_klo AS BIGINT), CAST(_khi AS BIGINT))) "
        f"AS k",
    ).selectExpr(
        entity, "plon", "plat", "lon", "lat",
        f"k * {D} AS tick_us",
        f"CAST(k * {D} - _pus AS DOUBLE) / CAST(_us - _pus AS DOUBLE) "
        f"AS f",
    )
    for name, expr in _slerp_cols_sql():
        segs = segs.withColumn(name, F.expr(expr))
    interp = segs.select(
        entity, "tick_us",
        F.expr(_SLERP_LON).alias("lon"),
        F.expr(_SLERP_LAT).alias("lat"),
        F.lit(True).alias("interpolated"),
    )
    return starts.unionByName(interp)


def track_resample_sql(
    src_sql: str,
    interval_us: int,
    max_gap_us: int = None,
    entity: str = "user_id",
    ts_us: str = "ts_us",
    seq: str = "event_id",
    lon: str = "lon",
    lat: str = "lat",
) -> str:
    """Oracle twin of :func:`track_resample`. The tick fan-out uses
    DuckDB's ``generate_series`` + ``unnest`` (empty when hi < lo, so no
    descending-sequence guard is needed there); every arithmetic /
    slerp expression is the SHARED string."""
    D = int(interval_us)
    order = f"PARTITION BY {entity} ORDER BY {ts_us}, {seq}"
    gap = (
        f"AND (_us - _pus) <= {int(max_gap_us)} "
        if max_gap_us is not None else ""
    )
    stage_sql = ""
    inner = "t"
    for name, expr in _slerp_cols_sql():
        stage_sql += f", {name}_s AS (SELECT *, {expr} AS {name} FROM {inner})"
        inner = f"{name}_s"
    # the CTE names shadow nothing: *_s suffixes
    return (
        f"WITH o AS (SELECT {entity}, {ts_us} AS _us, {lon} AS lon, "
        f"{lat} AS lat, lag({ts_us}) OVER w AS _pus, "
        f"lag({lon}) OVER w AS plon, lag({lat}) OVER w AS plat "
        f"FROM ({src_sql}) s WINDOW w AS ({order})), "
        f"st AS (SELECT {entity}, _us AS tick_us, round(lon, 6) AS lon, "
        f"round(lat, 6) AS lat, FALSE AS interpolated FROM o "
        f"WHERE _pus IS NULL AND _us % {D} = 0), "
        f"sg AS (SELECT {entity}, _pus, _us, plon, plat, lon, lat, "
        f"(_pus - (_pus % {D})) / {D} + 1 AS _klo, "
        f"(_us - (_us % {D})) / {D} AS _khi FROM o "
        f"WHERE _pus IS NOT NULL AND _us > _pus {gap}), "
        f"t AS (SELECT {entity}, plon, plat, lon, lat, "
        f"k * {D} AS tick_us, "
        f"CAST(k * {D} - _pus AS DOUBLE) / CAST(_us - _pus AS DOUBLE) "
        f"AS f FROM (SELECT sg.*, CAST(unnest(generate_series("
        f"CAST(_klo AS BIGINT), CAST(_khi AS BIGINT))) AS BIGINT) AS k "
        f"FROM sg) u)"
        f"{stage_sql} "
        f"SELECT {entity}, tick_us, lon, lat, interpolated FROM st "
        f"UNION ALL "
        f"SELECT {entity}, tick_us, {_SLERP_LON} AS lon, "
        f"{_SLERP_LAT} AS lat, TRUE AS interpolated FROM {inner}"
    )


# ---- space-time co-location (contact join) ----

def _coloc_params(
    max_dist_m: float, max_dt_us: int, cell_deg: float, lat_max: float
) -> tuple:
    """Validate the bucket cover and return (nx, T). The 3x3 spatial
    window is a complete cover of the max_dist_m disk ONLY while every
    cell axis is at least max_dist_m wide over the study band — the
    zonal width shrinks by cos(lat), so the constraint binds at
    lat_max. Failing loudly here is what makes the brute-force oracle
    a COVER test, not just a distance-filter test."""
    import math as _m

    from .cluster import _grid_params
    from .crs import R_SPHERE

    nx, _, _ = _grid_params(cell_deg)
    if nx < 4:
        raise ValueError(
            f"cell_deg={cell_deg} gives only {nx} lon cells; the "
            f"wrapped 3-cell window needs nx >= 4 to hit each "
            f"neighbor once"
        )
    if not 0.0 < lat_max <= 89.0:
        raise ValueError(f"lat_max must be in (0, 89], got {lat_max}")
    if not max_dt_us >= 1:
        raise ValueError(f"max_dt_us must be >= 1, got {max_dt_us}")
    meters_per_deg = _m.pi / 180.0 * R_SPHERE
    merid = cell_deg * meters_per_deg
    zonal = merid * _m.cos(_m.radians(lat_max))
    if max_dist_m > min(merid, zonal):
        raise ValueError(
            f"bucket cover violated: max_dist_m={max_dist_m} exceeds "
            f"the cell width at lat_max={lat_max} "
            f"(meridional {merid:.0f} m, zonal {zonal:.0f} m) — "
            f"enlarge cell_deg or shrink lat_max"
        )
    return nx, int(max_dt_us)


def _coloc_prepared_sql(
    src_sql: str, cell_deg: float, T: int, lat_max: float,
    entity: str, eid: str, ts_us: str, lon: str, lat: str,
) -> str:
    """The bucketed event view both engines share: study-band filter,
    wrapped cell coordinates, and the exact-integer time bucket
    ((t - pmod(t, T)) / T — floor for every sign; the quotient stays
    under 2^53 for micros, so the int/int double division is exact)."""
    from .cluster import cell_id_sql
    from .crs import _pf

    _, cx, cy = cell_id_sql(cell_deg, lon, lat)
    pm = f"((({ts_us}) % {T} + {T}) % {T})"
    return (
        f"SELECT {entity} AS u, {eid} AS e, {ts_us} AS t, "
        f"{lon} AS lo, {lat} AS la, {cx} AS cx, {cy} AS cy, "
        f"CAST((({ts_us}) - {pm}) / {T} AS BIGINT) AS tb "
        f"FROM ({src_sql}) s "
        f"WHERE abs({lat}) <= {_pf(lat_max)}"
    )


def colocation_pairs(
    df: DataFrame,
    max_dist_m: float,
    max_dt_us: int,
    cell_deg: float,
    lat_max: float,
    entity: str = "user_id",
    eid: str = "event_id",
    ts_us: str = "ts_us",
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Pairs of DISTINCT entities observed within ``max_dist_m`` meters
    AND ``max_dt_us`` microseconds of each other (the contact-tracing /
    co-occurrence join). Exact result: the bucketed join is a complete
    candidate cover (validated in :func:`_coloc_params`), and the join
    carries the exact predicates, so output equals the brute-force
    truth — the registry oracle IS the brute-force join, so an
    incomplete cover fails parity instead of hiding.

    Shape: each left event replicates into its 3x3 spatial x 3 temporal
    bucket window (27 rows, lon wrapped); the right side stays in its
    home bucket, so every qualifying ordered event pair (smaller entity
    id first) is found EXACTLY once — (dx, dy, db) is unique per pair
    while nx >= 4. Two hash exchanges on the bucket key, no corpus
    cross product; candidate volume is the sum of per-bucket products,
    bounded by cell size ~ max_dist_m. A single pathological bucket (a
    stadium) is inherent contact-join skew — AQE skew-join splits it,
    or shrink cell_deg toward max_dist_m.

    Output: (user_a, user_b, event_a, event_b, dt_us BIGINT signed
    b - a, dist_m round(.,3)).
    """
    nx, T = _coloc_params(max_dist_m, max_dt_us, cell_deg, lat_max)
    from .cluster import cell_id_sql
    from .crs import _pf

    _, cx, cy = cell_id_sql(cell_deg, lon, lat)
    pm = f"((({ts_us}) % {T} + {T}) % {T})"
    base = df.filter(F.expr(f"abs({lat}) <= {_pf(lat_max)}")).selectExpr(
        f"{entity} AS u", f"{eid} AS e", f"{ts_us} AS t",
        f"{lon} AS lo", f"{lat} AS la", f"{cx} AS cx", f"{cy} AS cy",
        f"CAST((({ts_us}) - {pm}) / {T} AS BIGINT) AS tb",
    )
    offs = ", ".join(
        f"struct({dx} AS dx, {dy} AS dy, {db} AS db)"
        for dx in (-1, 0, 1) for dy in (-1, 0, 1) for db in (-1, 0, 1)
    )
    a = base.selectExpr(
        "u AS ua", "e AS ea", "t AS ta", "lo AS loa", "la AS laa",
        "cx", "cy", "tb", f"explode(array({offs})) AS o",
    ).selectExpr(
        "ua", "ea", "ta", "loa", "laa",
        f"((cx + o.dx + {nx}) % {nx}) AS jx",
        "(cy + o.dy) AS jy",
        "(tb + o.db) AS jb",
    )
    b = base.selectExpr(
        "u AS ub", "e AS eb", "t AS tc", "lo AS lob", "la AS lab",
        "cx AS jx", "cy AS jy", "tb AS jb",
    )
    hav = haversine_m_sql("loa", "laa", "lob", "lab")
    return (
        a.join(b, ["jx", "jy", "jb"])
        .filter(F.expr(f"ua < ub AND abs(tc - ta) <= {T}"))
        .selectExpr(
            "ua", "ea", "ub", "eb", "tc", "ta",
            f"round({hav}, {_ND}) AS dist_m",
        )
        .filter(F.expr(f"dist_m <= {_pf(max_dist_m)}"))
        .selectExpr(
            "ua AS user_a", "ub AS user_b", "ea AS event_a",
            "eb AS event_b", "CAST(tc - ta AS BIGINT) AS dt_us",
            "dist_m",
        )
    )


def colocation_pairs_sql(
    src_sql: str,
    max_dist_m: float,
    max_dt_us: int,
    cell_deg: float,
    lat_max: float,
    entity: str = "user_id",
    eid: str = "event_id",
    ts_us: str = "ts_us",
    lon: str = "lon",
    lat: str = "lat",
) -> str:
    """BRUTE-FORCE oracle twin of :func:`colocation_pairs`: a time-range
    self-join (DuckDB plans an IEJoin) with the exact distance/time
    predicates and NO bucketing — so the oracle independently verifies
    that the engine's bucket cover is complete. Same keep rule
    (mm-rounded haversine <= max_dist_m) on both sides."""
    _coloc_params(max_dist_m, max_dt_us, cell_deg, lat_max)
    from .crs import _pf

    T = int(max_dt_us)
    prep = _coloc_prepared_sql(
        src_sql, cell_deg, T, lat_max, entity, eid, ts_us, lon, lat,
    )
    hav = haversine_m_sql("a.lo", "a.la", "b.lo", "b.la")
    return (
        f"WITH ev AS ({prep}) "
        f"SELECT user_a, user_b, event_a, event_b, dt_us, dist_m FROM ("
        f"SELECT a.u AS user_a, b.u AS user_b, a.e AS event_a, "
        f"b.e AS event_b, CAST(b.t - a.t AS BIGINT) AS dt_us, "
        f"round({hav}, {_ND}) AS dist_m "
        f"FROM ev a JOIN ev b "
        f"ON a.u < b.u AND b.t BETWEEN a.t - {T} AND a.t + {T}) p "
        f"WHERE dist_m <= {_pf(max_dist_m)}"
    )


# ---- origin-destination flows (trips between consecutive dwells) ----

def od_flows(
    df: DataFrame,
    max_step_m: float,
    min_duration_us: int,
    od_cell_deg: float,
    entity: str = "user_id",
    ts_us: str = "ts_us",
    seq: str = "event_id",
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Origin-destination matrix: each pair of CONSECUTIVE dwell
    segments (see :func:`dwell_segments`) is a trip from the origin
    dwell's centroid to the destination's; trips aggregate into flows
    between ``od_cell_deg`` graticule cells (lon wrapped, the cluster
    family's cell_id_sql).

    Exactness discipline: travel time sums as BIGINT micros; trip
    distance is snapped to BIGINT MILLIMETERS per trip before summing,
    so no double is ever summed (order-independent across engines); the
    two means are single double divisions of exact integers, round(.,6).

    Plan: dwell detection's one hashpartitioning(entity) exchange also
    serves the lead window (run_id ordering is per-entity), then ONE
    exchange to the OD-cell grain — two total, both over tables bounded
    by dwell counts, not raw fixes.

    Output: (o_cx, o_cy, d_cx, d_cy, n_trips, sum_travel_us BIGINT,
    avg_travel_us, mean_trip_m).
    """
    dw = dwell_segments(
        df, max_step_m=max_step_m, min_duration_us=min_duration_us,
        entity=entity, ts_us=ts_us, seq=seq, lon=lon, lat=lat,
    )
    return od_flows_from_dwells(dw, od_cell_deg, entity=entity)


def od_flows_from_dwells(
    dw: DataFrame,
    od_cell_deg: float,
    entity: str = "user_id",
) -> DataFrame:
    """The dwell-table half of :func:`od_flows` — takes a persisted
    dwell table (the resumable job's checkpointed phase boundary,
    ``jobs/run_mobility.py``) with columns (entity, run_id, start_us,
    end_us, c_lon, c_lat) and aggregates consecutive-dwell trips into
    OD-cell flows. Same integer-exactness discipline as od_flows."""
    from .cluster import cell_id_sql

    w = Window.partitionBy(entity).orderBy("run_id")
    hav = haversine_m_sql("c_lon", "c_lat", "n_lon", "n_lat")
    _, ocx, ocy = cell_id_sql(od_cell_deg, "c_lon", "c_lat")
    _, dcx, dcy = cell_id_sql(od_cell_deg, "n_lon", "n_lat")
    trips = dw.select(
        entity, "run_id", "end_us", "c_lon", "c_lat",
        F.lead("start_us").over(w).alias("n_start"),
        F.lead("c_lon").over(w).alias("n_lon"),
        F.lead("c_lat").over(w).alias("n_lat"),
    ).filter(F.col("n_start").isNotNull()).selectExpr(
        f"{ocx} AS o_cx", f"{ocy} AS o_cy",
        f"{dcx} AS d_cx", f"{dcy} AS d_cy",
        "CAST(n_start - end_us AS BIGINT) AS travel_us",
        f"CAST(round(({hav}) * 1000.0E0, 0) AS BIGINT) AS trip_mm",
    )
    return trips.groupBy("o_cx", "o_cy", "d_cx", "d_cy").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_trips"),
        F.sum("travel_us").cast("bigint").alias("sum_travel_us"),
        F.sum("trip_mm").cast("bigint").alias("_mm"),
    ).selectExpr(
        "o_cx", "o_cy", "d_cx", "d_cy", "n_trips", "sum_travel_us",
        # r6: avg_travel_us reaches ~1e11 micros, where |x|*1e6 > 2^53
        # and DuckDB's lossy multiply-round-divide differs from Spark's
        # decimal-exact round by an ulp (13 rows at sf0.01 — caught by
        # the strict gate; od_flows has never had a driver row, so this
        # was a latent exact-hash red). Emulate DuckDB's arithmetic.
        f"{duck_round_sql('CAST(sum_travel_us AS DOUBLE) / CAST(n_trips AS DOUBLE)')} "
        "AS avg_travel_us",
        f"{duck_round_sql('CAST(_mm AS DOUBLE) / 1000.0E0 / CAST(n_trips AS DOUBLE)')} "
        "AS mean_trip_m",
    )


def od_flows_sql(
    src_sql: str,
    max_step_m: float,
    min_duration_us: int,
    od_cell_deg: float,
    entity: str = "user_id",
    ts_us: str = "ts_us",
    seq: str = "event_id",
    lon: str = "lon",
    lat: str = "lat",
) -> str:
    """Oracle twin of :func:`od_flows` — the dwell cascade as a CTE,
    the same lead window (ordered by run_id, which is strictly
    increasing in time per entity), the same integer-exact sums."""
    from .cluster import cell_id_sql

    dwsql = dwell_segments_sql(
        src_sql, max_step_m=max_step_m, min_duration_us=min_duration_us,
        entity=entity, ts_us=ts_us, seq=seq, lon=lon, lat=lat,
    )
    hav = haversine_m_sql("c_lon", "c_lat", "n_lon", "n_lat")
    _, ocx, ocy = cell_id_sql(od_cell_deg, "c_lon", "c_lat")
    _, dcx, dcy = cell_id_sql(od_cell_deg, "n_lon", "n_lat")
    return (
        f"WITH dw AS ({dwsql}), "
        f"nxt AS (SELECT {entity}, run_id, end_us, c_lon, c_lat, "
        f"lead(start_us) OVER w AS n_start, "
        f"lead(c_lon) OVER w AS n_lon, lead(c_lat) OVER w AS n_lat "
        f"FROM dw WINDOW w AS (PARTITION BY {entity} ORDER BY run_id)), "
        f"trips AS (SELECT {ocx} AS o_cx, {ocy} AS o_cy, "
        f"{dcx} AS d_cx, {dcy} AS d_cy, "
        f"CAST(n_start - end_us AS BIGINT) AS travel_us, "
        f"CAST(round(({hav}) * 1000.0E0, 0) AS BIGINT) AS trip_mm "
        f"FROM nxt WHERE n_start IS NOT NULL), "
        f"g AS (SELECT o_cx, o_cy, d_cx, d_cy, "
        f"CAST(count(*) AS BIGINT) AS n_trips, "
        f"CAST(sum(travel_us) AS BIGINT) AS sum_travel_us, "
        f"CAST(sum(trip_mm) AS BIGINT) AS _mm "
        f"FROM trips GROUP BY o_cx, o_cy, d_cx, d_cy) "
        f"SELECT o_cx, o_cy, d_cx, d_cy, n_trips, sum_travel_us, "
        f"round(CAST(sum_travel_us AS DOUBLE) / CAST(n_trips AS DOUBLE), "
        f"6) AS avg_travel_us, "
        f"round(CAST(_mm AS DOUBLE) / 1000.0E0 "
        f"/ CAST(n_trips AS DOUBLE), 6) AS mean_trip_m FROM g"
    )


# ------------------- mobility scalars: radius of gyration, entropy --

#: fixed-point scale for unit-vector components: sums stay BIGINT-exact
#: up to ~9e6 fixes per entity (1e12 * 9.2e6 < 2^63); split upstream by
#: period for entities beyond that (the track_stats skew posture)
_VEC_SCALE = 1_000_000_000_000


def _unit_vec_sql(lon: str, lat: str) -> tuple:
    """Quantized unit-vector components (BIGINT) of a (lon, lat) fix —
    dialect-neutral; round() before CAST so both engines snap the same
    double to the same integer."""
    s = f"{_VEC_SCALE}.0E0"
    return tuple(
        f"CAST(round({expr} * {s}, 0) AS BIGINT)"
        for expr in (
            f"(cos(radians({lat})) * cos(radians({lon})))",
            f"(cos(radians({lat})) * sin(radians({lon})))",
            f"(sin(radians({lat})))",
        )
    )


def gyration_radius(
    df: DataFrame,
    entity: str = "user_id",
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Per-entity radius of gyration — THE mobility-range scalar
    (Gonzalez, Hidalgo & Barabasi 2008): the RMS distance of an
    entity's fixes from its centroid. Computed in the chord metric on
    the unit sphere, where it is a CLOSED FORM of the mean direction:

        r_g = R * sqrt(max(0, 1 - |v_mean|^2))

    (mean squared chord deviation = E|v|^2 - |v_mean|^2 = 1 - |v_mean|^2
    for unit vectors; chord RMS lower-bounds the great-circle RMS and
    agrees to O(r_g/R)^2 for local tracks). Wrap/pole-safe by
    construction — no longitude averaging anywhere.

    Exactness: components are quantized to BIGINT at 1e12
    (:func:`_unit_vec_sql`) so per-entity sums are exact integers; the
    mean-vector norm is a single shared double expression of those
    integers. ONE hash aggregation with map-side partials — the 100-TB
    shape; no window, no join, no second pass.

    Resolution: the sqrt amplifies the 1e-12 quantization near
    |v_mean| = 1, so a MOVING entity's radius carries a <= ~10 m noise
    floor (far below GPS fix noise). Exactly-stationary entities
    (all quantized components constant — min = max per axis, checked in
    the same aggregation) report r_gyr_m = 0 exactly.

    Output: (entity, n_fixes, centroid_lon, centroid_lat, r_gyr_m) with
    the centroid the normalized mean direction (atan2 of exact sums;
    NULL if the mean vector vanishes), floats round(.,6).
    """
    vx, vy, vz = _unit_vec_sql(lon, lat)
    base = df.selectExpr(
        f"{entity} AS entity", f"{vx} AS qx", f"{vy} AS qy", f"{vz} AS qz"
    )
    agg = base.groupBy("entity").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_fixes"),
        F.sum("qx").cast("bigint").alias("sx"),
        F.sum("qy").cast("bigint").alias("sy"),
        F.sum("qz").cast("bigint").alias("sz"),
        F.expr("CAST(max(qx) - min(qx) + max(qy) - min(qy) "
               "+ max(qz) - min(qz) AS BIGINT)").alias("spread"),
    )
    return agg.selectExpr(
        "entity", "n_fixes", *_gyr_out_sql(),
    )


def _gyr_out_sql() -> tuple:
    """The shared (centroid_lon, centroid_lat, r_gyr_m) projection over
    (n_fixes, sx, sy, sz, spread) — one string, both dialects; spread
    (the summed per-axis min-max ranges of the quantized components) is
    0 iff every fix quantized identically, which pins the stationary
    case to exactly 0 instead of the quantization noise floor."""
    s = f"{_VEC_SCALE}.0E0"
    mx = f"(CAST(sx AS DOUBLE) / CAST(n_fixes AS DOUBLE) / {s})"
    my = f"(CAST(sy AS DOUBLE) / CAST(n_fixes AS DOUBLE) / {s})"
    mz = f"(CAST(sz AS DOUBLE) / CAST(n_fixes AS DOUBLE) / {s})"
    norm2 = f"({mx} * {mx} + {my} * {my} + {mz} * {mz})"
    from .crs import R_SPHERE, _pf

    return (
        f"round(CASE WHEN {norm2} > 0.0E0 THEN "
        f"degrees(atan2({my}, {mx})) END, 6) AS centroid_lon",
        f"round(CASE WHEN {norm2} > 0.0E0 THEN "
        f"degrees(atan2({mz}, sqrt({mx} * {mx} + {my} * {my}))) END, 6) "
        f"AS centroid_lat",
        f"round(CASE WHEN spread = 0 THEN 0.0E0 ELSE "
        f"{_pf(R_SPHERE)} * sqrt(greatest(0.0E0, "
        f"1.0E0 - {norm2})) END, 3) AS r_gyr_m",
    )


def gyration_radius_sql(
    src_sql: str,
    entity: str = "user_id",
    lon: str = "lon",
    lat: str = "lat",
) -> str:
    """Oracle twin of :func:`gyration_radius` (same shared strings)."""
    vx, vy, vz = _unit_vec_sql(lon, lat)
    outs = ", ".join(_gyr_out_sql())
    return (
        f"WITH q AS (SELECT {entity} AS entity, {vx} AS qx, "
        f"{vy} AS qy, {vz} AS qz FROM ({src_sql}) s), "
        f"g AS (SELECT entity, CAST(count(*) AS BIGINT) AS n_fixes, "
        f"CAST(sum(qx) AS BIGINT) AS sx, CAST(sum(qy) AS BIGINT) AS sy, "
        f"CAST(sum(qz) AS BIGINT) AS sz, "
        f"CAST(max(qx) - min(qx) + max(qy) - min(qy) "
        f"+ max(qz) - min(qz) AS BIGINT) AS spread "
        f"FROM q GROUP BY entity) "
        f"SELECT entity, n_fixes, {outs} FROM g"
    )


#: fixed-point scale for the entropy terms c*log2(c): quantized to 1e-6
#: bits-per-term so the per-entity sum is exact BIGINT arithmetic
#: (order-independent) — safe to ~9e9 fixes in one cell and ~10^5 cells
_ENT_SCALE = 1_000_000


def _ent_sql() -> tuple:
    """Shared per-entity projection over (entity, c)-count rows:
    Shannon entropy of the visit distribution H = log2(n) - S/n with
    S = Σ c·log2(c), each term quantized to BIGINT at 1e-6 bits, plus
    the top-cell share (the predictability proxy)."""
    term = (
        f"CAST(round(CAST(c AS DOUBLE) * log2(CAST(c AS DOUBLE)) "
        f"* {_ENT_SCALE}.0E0, 0) AS BIGINT)"
    )
    return term, (
        "round(log2(CAST(n_fixes AS DOUBLE)) "
        f"- CAST(s_ent AS DOUBLE) / {_ENT_SCALE}.0E0 "
        "/ CAST(n_fixes AS DOUBLE), 6) AS entropy_bits",
        "round(CAST(c_max AS DOUBLE) / CAST(n_fixes AS DOUBLE), 6) "
        "AS top_share",
    )


def location_entropy(
    df: DataFrame,
    cell_deg: float,
    entity: str = "user_id",
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Per-entity Shannon entropy (bits) of the graticule-cell visit
    distribution — the mobility-predictability scalar (Song et al. 2010
    random-entropy family): 0 for a single-cell homebody, log2(k) for k
    equally-visited cells.

    Exactness: per-cell counts are BIGINT; each c·log2(c) term is
    quantized to BIGINT at 1e-6 bits (:data:`_ENT_SCALE`) so the
    per-entity sum is exact integer arithmetic — order-independent
    across engines/partitionings (the sum(double) parity trap, same
    posture as the KDE kernel weights). The closing formula is one
    shared double expression.

    Plan: two hash aggregations — (entity, cell) counts with map-side
    partials, then the per-entity rollup; no window, no join. Output:
    (entity, n_fixes, n_cells, entropy_bits, top_share).
    """
    from .cluster import cell_id_sql

    cid, _, _ = cell_id_sql(cell_deg, lon, lat)
    counts = (
        df.selectExpr(f"{entity} AS entity", f"{cid} AS cell")
        .groupBy("entity", "cell")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    term, outs = _ent_sql()
    g = counts.selectExpr("entity", "c", f"{term} AS e").groupBy(
        "entity"
    ).agg(
        F.sum("c").cast("bigint").alias("n_fixes"),
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.sum("e").cast("bigint").alias("s_ent"),
        F.max("c").cast("bigint").alias("c_max"),
    )
    return g.selectExpr("entity", "n_fixes", "n_cells", *outs)


def location_entropy_sql(
    src_sql: str,
    cell_deg: float,
    entity: str = "user_id",
    lon: str = "lon",
    lat: str = "lat",
) -> str:
    """Oracle twin of :func:`location_entropy` (same shared strings)."""
    from .cluster import cell_id_sql

    cid, _, _ = cell_id_sql(cell_deg, lon, lat)
    term, outs = _ent_sql()
    outs_sql = ", ".join(outs)
    return (
        f"WITH cellc AS (SELECT {entity} AS entity, {cid} AS cell, "
        f"CAST(count(*) AS BIGINT) AS c FROM ({src_sql}) s "
        f"GROUP BY 1, 2), "
        f"g AS (SELECT entity, CAST(sum(c) AS BIGINT) AS n_fixes, "
        f"CAST(count(*) AS BIGINT) AS n_cells, "
        f"CAST(sum({term}) AS BIGINT) AS s_ent, "
        f"CAST(max(c) AS BIGINT) AS c_max FROM cellc GROUP BY entity) "
        f"SELECT entity, n_fixes, n_cells, {outs_sql} FROM g"
    )


# ------------------------- synchronized pair separation (sync join) --

def pair_sync_distance(
    df: DataFrame,
    pairs: DataFrame,
    interval_us: int,
    max_gap_us: int,
    together_m: float,
    entity: str = "user_id",
    ts_us: str = "ts_us",
    seq: str = "event_id",
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Synchronized separation statistics for candidate entity pairs —
    the "traveling together" / convoy primitive: both tracks are
    resampled onto the SAME time grid (:func:`track_resample`, so the
    comparison is time-aligned by construction), then each candidate
    pair's positions join on the tick and the per-tick geodesic
    separation aggregates.

    ``pairs`` carries (user_a, user_b) candidates with user_a < user_b
    — produce it with :func:`colocation_pairs` (distinct pairs) or any
    blocking rule; feeding all-pairs is the quadratic trap this
    argument exists to avoid. It broadcasts onto the resampled track
    table, so the join fan-out is bounded by each entity's candidate
    multiplicity, never by the entity count.

    Exactness: per-tick distance rounds to mm; the mean sums BIGINT
    MILLIMETERS (order-independent) and divides once; min/max and the
    together ratio (fraction of shared ticks <= ``together_m``) compare
    ROUNDED values, so branch choices are engine-stable.

    Output: (user_a, user_b, n_sync_ticks, min_dist_m, max_dist_m,
    mean_dist_m, together_ratio).
    """
    if not together_m > 0:
        raise ValueError(f"together_m must be positive, got {together_m}")
    r = track_resample(
        df, interval_us=interval_us, max_gap_us=max_gap_us,
        entity=entity, ts_us=ts_us, seq=seq, lon=lon, lat=lat,
    )
    a = r.selectExpr(
        f"{entity} AS user_a", "tick_us", "lon AS lon_a", "lat AS lat_a"
    ).join(F.broadcast(pairs.select("user_a", "user_b")), ["user_a"])
    b = r.selectExpr(
        f"{entity} AS user_b", "tick_us", "lon AS lon_b", "lat AS lat_b"
    )
    hav = haversine_m_sql("lon_a", "lat_a", "lon_b", "lat_b")
    from .crs import _pf

    ticks = a.join(b, ["user_b", "tick_us"]).selectExpr(
        "user_a", "user_b", "tick_us",
        f"round({hav}, {_ND}) AS dist_m",
    )
    return ticks.groupBy("user_a", "user_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sync_ticks"),
        F.min("dist_m").alias("min_dist_m"),
        F.max("dist_m").alias("max_dist_m"),
        F.expr(
            "CAST(sum(CAST(round(dist_m * 1000.0E0, 0) AS BIGINT)) "
            "AS BIGINT)"
        ).alias("_mm"),
        F.expr(
            f"CAST(sum(CASE WHEN dist_m <= {_pf(together_m)} "
            f"THEN 1 ELSE 0 END) AS BIGINT)"
        ).alias("_tog"),
    ).selectExpr(
        "user_a", "user_b", "n_sync_ticks", "min_dist_m", "max_dist_m",
        "round(CAST(_mm AS DOUBLE) / 1000.0E0 "
        "/ CAST(n_sync_ticks AS DOUBLE), 6) AS mean_dist_m",
        "round(CAST(_tog AS DOUBLE) / CAST(n_sync_ticks AS DOUBLE), 6) "
        "AS together_ratio",
    )


def pair_sync_distance_sql(
    src_sql: str,
    pairs_sql: str,
    interval_us: int,
    max_gap_us: int,
    together_m: float,
    entity: str = "user_id",
    ts_us: str = "ts_us",
    seq: str = "event_id",
    lon: str = "lon",
    lat: str = "lat",
) -> str:
    """Oracle twin of :func:`pair_sync_distance`: the resample CTE is
    the SHARED :func:`track_resample_sql` string; ``pairs_sql`` must
    yield (user_a, user_b)."""
    if not together_m > 0:
        raise ValueError(f"together_m must be positive, got {together_m}")
    from .crs import _pf

    rs = track_resample_sql(
        src_sql, interval_us=interval_us, max_gap_us=max_gap_us,
        entity=entity, ts_us=ts_us, seq=seq, lon=lon, lat=lat,
    )
    hav = haversine_m_sql("a.lon", "a.lat", "b.lon", "b.lat")
    return (
        f"WITH r AS ({rs}), cand AS ({pairs_sql}), "
        f"t AS (SELECT c.user_a, c.user_b, a.tick_us, "
        f"round({hav}, {_ND}) AS dist_m "
        f"FROM cand c JOIN r a ON a.{entity} = c.user_a "
        f"JOIN r b ON b.{entity} = c.user_b "
        f"AND b.tick_us = a.tick_us) "
        f"SELECT user_a, user_b, "
        f"CAST(count(*) AS BIGINT) AS n_sync_ticks, "
        f"min(dist_m) AS min_dist_m, max(dist_m) AS max_dist_m, "
        f"round(CAST(CAST(sum(CAST(round(dist_m * 1000.0E0, 0) "
        f"AS BIGINT)) AS BIGINT) AS DOUBLE) / 1000.0E0 "
        f"/ CAST(count(*) AS DOUBLE), 6) AS mean_dist_m, "
        f"round(CAST(sum(CASE WHEN dist_m <= {_pf(together_m)} "
        f"THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) "
        f"AS together_ratio "
        f"FROM t GROUP BY user_a, user_b"
    )


# --------------------- temporal burstiness + directional statistics --

def burstiness(
    df: DataFrame,
    entity: str = "user_id",
    ts_us: str = "ts_us",
    seq: str = "event_id",
) -> DataFrame:
    """Per-entity inter-event-time statistics + the Goh-Barabasi
    burstiness coefficient B = (σ − μ)/(σ + μ) over the consecutive-fix
    gaps (B → −1 periodic, 0 Poisson, → 1 bursty).

    Exactness: gaps are exact BIGINT micros but their squares overflow
    at month-scale spans, so gaps quantize to WHOLE SECONDS
    (floor((t−t_prev)/1e6) — exact integer division) before the moment
    sums: Σg and Σg² stay BIGINT-exact to ~2.9e5 user-years of span per
    entity, and σ² = (nΣg² − (Σg)²)/n² is formed from exact integers in
    one shared double expression (population σ, matching the standard
    B definition). Entities with < 2 fixes are absent (no gaps).

    Plan: the lag window and the aggregate share ONE
    hashpartitioning(entity) exchange. Output: (entity, n_gaps,
    mean_gap_s, std_gap_s, burstiness), floats round(.,6).
    """
    w = Window.partitionBy(entity).orderBy(ts_us, seq)
    # group on the ORIGINAL entity column (rename only at the end):
    # an early alias defeats the alias-aware partitioning reuse and
    # costs a second exchange
    g = df.select(
        F.col(entity),
        F.col(ts_us).alias("t"),
        F.lag(ts_us).over(w).alias("t_prev"),
    ).filter(F.col("t_prev").isNotNull()).selectExpr(
        entity,
        "CAST((t - t_prev - ((t - t_prev) % 1000000)) / 1000000 "
        "AS BIGINT) AS gs",
    )
    agg = g.groupBy(entity).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
        F.sum("gs").cast("bigint").alias("sg"),
        F.expr("CAST(sum(gs * gs) AS BIGINT)").alias("sgg"),
    )
    return agg.selectExpr(
        f"{entity} AS entity", "n_gaps", *_burst_out_sql()
    )


def _burst_out_sql() -> tuple:
    """Shared (mean_gap_s, std_gap_s, burstiness) projection over
    (n_gaps, sg, sgg) — population variance via the exact-integer
    identity n·Σg² − (Σg)², computed in doubles from exact inputs."""
    n = "CAST(n_gaps AS DOUBLE)"
    mu = f"(CAST(sg AS DOUBLE) / {n})"
    var = (
        f"greatest(0.0E0, ({n} * CAST(sgg AS DOUBLE) "
        f"- CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)) / ({n} * {n}))"
    )
    sd = f"sqrt({var})"
    return (
        f"round({mu}, 6) AS mean_gap_s",
        f"round({sd}, 6) AS std_gap_s",
        f"round(CASE WHEN {sd} + {mu} > 0.0E0 THEN "
        f"({sd} - {mu}) / ({sd} + {mu}) END, 6) AS burstiness",
    )


def burstiness_sql(
    src_sql: str,
    entity: str = "user_id",
    ts_us: str = "ts_us",
    seq: str = "event_id",
) -> str:
    """Oracle twin of :func:`burstiness` (same shared strings)."""
    outs = ", ".join(_burst_out_sql())
    return (
        f"WITH l AS (SELECT {entity} AS entity, {ts_us} AS t, "
        f"lag({ts_us}) OVER (PARTITION BY {entity} "
        f"ORDER BY {ts_us}, {seq}) AS t_prev FROM ({src_sql}) s), "
        f"g AS (SELECT entity, "
        f"CAST((t - t_prev - ((t - t_prev) % 1000000)) / 1000000 "
        f"AS BIGINT) AS gs FROM l WHERE t_prev IS NOT NULL), "
        f"a AS (SELECT entity, CAST(count(*) AS BIGINT) AS n_gaps, "
        f"CAST(sum(gs) AS BIGINT) AS sg, "
        f"CAST(sum(gs * gs) AS BIGINT) AS sgg FROM g GROUP BY entity) "
        f"SELECT entity, n_gaps, {outs} FROM a"
    )


def step_direction_stats(
    df: DataFrame,
    entity: str = "user_id",
    ts_us: str = "ts_us",
    seq: str = "event_id",
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Per-entity circular statistics of step headings — the movement-
    anisotropy scalar: mean bearing (degrees [0, 360)) and the mean
    resultant length R̄ ∈ [0, 1] (1 = every step the same heading,
    0 = isotropic; Mardia & Jupp directional statistics).

    Each consecutive-fix step contributes its initial great-circle
    bearing as a unit vector; components quantize to BIGINT at 1e12
    (the gyration posture) so per-entity sums are exact integers —
    order-independent — and the closing atan2/norm is one shared double
    expression. Coincident fixes (zero step) are excluded: they carry
    no heading. ONE hashpartitioning(entity) exchange (lag window +
    aggregate). Output: (entity, n_steps, mean_bearing_deg, rbar).
    """
    w = Window.partitionBy(entity).orderBy(ts_us, seq)
    # original entity column through window + groupBy (rename at the
    # end) — see burstiness for the alias-partitioning note
    pairs = df.select(
        F.col(entity),
        F.col(lon).alias("lo"), F.col(lat).alias("la"),
        F.lag(lon).over(w).alias("plo"),
        F.lag(lat).over(w).alias("pla"),
    ).filter(
        F.col("plo").isNotNull()
        & ~((F.col("lo") == F.col("plo")) & (F.col("la") == F.col("pla")))
    )
    east, north = _bearing_vec_sql("plo", "pla", "lo", "la")
    s = f"{_VEC_SCALE}.0E0"
    q = pairs.selectExpr(
        entity,
        f"CAST(round(({east}) * {s}, 0) AS BIGINT) AS qe",
        f"CAST(round(({north}) * {s}, 0) AS BIGINT) AS qn",
    ).filter("qe IS NOT NULL")  # antipodal step: heading undefined
    agg = q.groupBy(entity).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_steps"),
        F.sum("qe").cast("bigint").alias("se"),
        F.sum("qn").cast("bigint").alias("sn"),
    )
    return agg.selectExpr(
        f"{entity} AS entity", "n_steps", *_dir_out_sql()
    )


def _bearing_vec_sql(lon1: str, lat1: str, lon2: str, lat2: str) -> tuple:
    """(east, north) unit components of the initial bearing from p1 to
    p2 — the NORMALIZED atan2 arguments (y, x)/hypot, dialect-neutral.
    Wrap-safe: Δλ appears only under sin/cos."""
    dl = f"radians(({lon2}) - ({lon1}))"
    y = f"(sin({dl}) * cos(radians({lat2})))"
    x = (
        f"(cos(radians({lat1})) * sin(radians({lat2})) "
        f"- sin(radians({lat1})) * cos(radians({lat2})) * cos({dl}))"
    )
    h = f"sqrt({y} * {y} + {x} * {x})"
    return f"({y} / nullif({h}, 0.0E0))", f"({x} / nullif({h}, 0.0E0))"


def _dir_out_sql() -> tuple:
    """Shared (mean_bearing_deg, rbar) projection over
    (n_steps, se, sn)."""
    s = f"{_VEC_SCALE}.0E0"
    me = f"(CAST(se AS DOUBLE) / CAST(n_steps AS DOUBLE) / {s})"
    mn = f"(CAST(sn AS DOUBLE) / CAST(n_steps AS DOUBLE) / {s})"
    rbar = f"sqrt({me} * {me} + {mn} * {mn})"
    return (
        f"round(CASE WHEN {rbar} > 0.0E0 THEN "
        f"((degrees(atan2({me}, {mn})) % 360.0E0) + 360.0E0) % 360.0E0 "
        f"END, 6) AS mean_bearing_deg",
        f"round({rbar}, 6) AS rbar",
    )


def step_direction_stats_sql(
    src_sql: str,
    entity: str = "user_id",
    ts_us: str = "ts_us",
    seq: str = "event_id",
    lon: str = "lon",
    lat: str = "lat",
) -> str:
    """Oracle twin of :func:`step_direction_stats`."""
    east, north = _bearing_vec_sql("plo", "pla", "lo", "la")
    s = f"{_VEC_SCALE}.0E0"
    outs = ", ".join(_dir_out_sql())
    return (
        f"WITH l AS (SELECT {entity} AS entity, {lon} AS lo, "
        f"{lat} AS la, lag({lon}) OVER w AS plo, "
        f"lag({lat}) OVER w AS pla FROM ({src_sql}) s "
        f"WINDOW w AS (PARTITION BY {entity} ORDER BY {ts_us}, {seq})), "
        f"q AS (SELECT entity, "
        f"CAST(round(({east}) * {s}, 0) AS BIGINT) AS qe, "
        f"CAST(round(({north}) * {s}, 0) AS BIGINT) AS qn "
        f"FROM l WHERE plo IS NOT NULL "
        f"AND NOT (lo = plo AND la = pla)), "
        f"qf AS (SELECT * FROM q WHERE qe IS NOT NULL), "
        f"a AS (SELECT entity, CAST(count(*) AS BIGINT) AS n_steps, "
        f"CAST(sum(qe) AS BIGINT) AS se, CAST(sum(qn) AS BIGINT) AS sn "
        f"FROM qf GROUP BY entity) "
        f"SELECT entity, n_steps, {outs} FROM a"
    )


# ------------------------ Rayleigh test for directional uniformity --


def _rayleigh_out_sql(alpha: float) -> tuple:
    """Shared projection over (n_steps, se, sn): the Rayleigh
    statistic z = n·R̄² = R²/n (R the resultant length in step units)
    and the Zar (1999, eq. 27.4) finite-n tail
    P = exp(√(1 + 4n + 4(n² − R²)) − (1 + 2n)) — exact for the
    leading asymptotics, < 1e-3 absolute error for n ≥ 10 (documented;
    exp/sqrt are the accepted libm precedent, one SHARED string both
    engines). The label compares the UNROUNDED identical-expression P
    against the alpha literal. Requires n >= 2; R² is computed in
    DOUBLE (se² would overflow BIGINT past ~3e5 steps, so the exact-
    integer lane ends at the sums, documented)."""
    from .crs import _pf

    s = f"{_VEC_SCALE}.0E0"
    nn = "CAST(n_steps AS DOUBLE)"
    r2 = (
        f"((CAST(se AS DOUBLE) * CAST(se AS DOUBLE) "
        f"+ CAST(sn AS DOUBLE) * CAST(sn AS DOUBLE)) / ({s} * {s}))"
    )
    z = f"({r2} / {nn})"
    p = (
        f"least(1.0E0, exp(sqrt(1.0E0 + 4.0E0 * {nn} "
        f"+ 4.0E0 * ({nn} * {nn} - {r2})) - (1.0E0 + 2.0E0 * {nn})))"
    )
    sig = f"({p} < {_pf(float(alpha))})"
    return (
        f"round({z}, 6) AS rayleigh_z",
        f"round({p}, 6) AS p_value",
        f"(CASE WHEN {sig} THEN 'directed' ELSE 'uniform' END) "
        f"AS movement",
    )


def rayleigh_test(
    df: DataFrame,
    alpha: float = 0.05,
    entity: str = "user_id",
    ts_us: str = "ts_us",
    seq: str = "event_id",
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Per-entity Rayleigh test of heading uniformity (Lord Rayleigh
    1880; Mardia & Jupp §6.3 — THE standard first test in circular
    statistics): is the entity's step-bearing distribution uniform
    (aimless wandering) or unimodally directed (migration/commute)?
    z = n·R̄² with the same exact-BIGINT bearing-vector sums as
    :func:`step_direction_stats` (1e12 quantum, order-independent);
    the Zar finite-n tail closes the inference that rbar alone leaves
    open. Entities with < 2 usable steps are dropped (no test).

    Output: (entity, n_steps, rbar, rayleigh_z, p_value, movement)
    with movement in {'directed','uniform'} at level alpha.
    """
    if not 0.0 < alpha < 1.0:
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
    w = Window.partitionBy(entity).orderBy(ts_us, seq)
    pairs = df.select(
        F.col(entity),
        F.col(lon).alias("lo"), F.col(lat).alias("la"),
        F.lag(lon).over(w).alias("plo"),
        F.lag(lat).over(w).alias("pla"),
    ).filter(
        F.col("plo").isNotNull()
        & ~((F.col("lo") == F.col("plo")) & (F.col("la") == F.col("pla")))
    )
    east, north = _bearing_vec_sql("plo", "pla", "lo", "la")
    s = f"{_VEC_SCALE}.0E0"
    q = pairs.selectExpr(
        entity,
        f"CAST(round(({east}) * {s}, 0) AS BIGINT) AS qe",
        f"CAST(round(({north}) * {s}, 0) AS BIGINT) AS qn",
    ).filter("qe IS NOT NULL")
    agg = q.groupBy(entity).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_steps"),
        F.sum("qe").cast("bigint").alias("se"),
        F.sum("qn").cast("bigint").alias("sn"),
    ).filter("n_steps >= 2")
    _, rbar = _dir_out_sql()
    return agg.selectExpr(
        f"{entity} AS entity", "n_steps", rbar,
        *_rayleigh_out_sql(alpha),
    )


def rayleigh_test_sql(
    src_sql: str,
    alpha: float = 0.05,
    entity: str = "user_id",
    ts_us: str = "ts_us",
    seq: str = "event_id",
    lon: str = "lon",
    lat: str = "lat",
) -> str:
    """Oracle twin of :func:`rayleigh_test` (the step_direction_stats
    SQL shape + the shared Rayleigh projection)."""
    if not 0.0 < alpha < 1.0:
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
    east, north = _bearing_vec_sql("plo", "pla", "lo", "la")
    s = f"{_VEC_SCALE}.0E0"
    _, rbar = _dir_out_sql()
    outs = ", ".join((rbar,) + _rayleigh_out_sql(alpha))
    return (
        f"WITH l AS (SELECT {entity} AS entity, {lon} AS lo, "
        f"{lat} AS la, lag({lon}) OVER w AS plo, "
        f"lag({lat}) OVER w AS pla FROM ({src_sql}) s "
        f"WINDOW w AS (PARTITION BY {entity} ORDER BY {ts_us}, {seq})), "
        f"q AS (SELECT entity, "
        f"CAST(round(({east}) * {s}, 0) AS BIGINT) AS qe, "
        f"CAST(round(({north}) * {s}, 0) AS BIGINT) AS qn "
        f"FROM l WHERE plo IS NOT NULL "
        f"AND NOT (lo = plo AND la = pla)), "
        f"qf AS (SELECT * FROM q WHERE qe IS NOT NULL), "
        f"a AS (SELECT entity, CAST(count(*) AS BIGINT) AS n_steps, "
        f"CAST(sum(qe) AS BIGINT) AS se, CAST(sum(qn) AS BIGINT) AS sn "
        f"FROM qf GROUP BY entity) "
        f"SELECT entity, n_steps, {outs} FROM a WHERE n_steps >= 2"
    )


# ------------------------------------ daily-rhythm circular statistics --

def daily_rhythm(
    df: DataFrame,
    entity: str = "user_id",
    ts_us: str = "ts_us",
) -> DataFrame:
    """Per-entity circular statistics of the TIME OF DAY of fixes — the
    routine/periodicity scalar: peak_hour_utc (circular mean of the
    24-hour phase, [0, 24)) and rhythm (mean resultant length R̄ ∈
    [0, 1]: 1 = every fix at the same wall-clock time, 0 = uniform
    around the clock; the von Mises concentration proxy).

    Phase angle θ = 2π·(t mod 86400s)/86400 from exact integer
    microseconds-of-day; unit-vector components quantize to BIGINT at
    1e12 (the gyration posture) so per-entity sums are exact integers,
    and the closing atan2/norm is one shared double expression. ONE
    hash aggregation, map-side partials. Output: (entity, n_fixes,
    peak_hour_utc, rhythm), floats round(.,6).
    """
    day = 86_400_000_000
    phase = (
        f"(2.0E0 * pi() * CAST((({ts_us}) % {day} + {day}) % {day} "
        f"AS DOUBLE) / {float(day)!r}E0)"
    )
    s = f"{_VEC_SCALE}.0E0"
    q = df.selectExpr(
        entity,
        f"CAST(round(cos({phase}) * {s}, 0) AS BIGINT) AS qc",
        f"CAST(round(sin({phase}) * {s}, 0) AS BIGINT) AS qs",
    )
    agg = q.groupBy(entity).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_fixes"),
        F.sum("qc").cast("bigint").alias("sc"),
        F.sum("qs").cast("bigint").alias("ss"),
    )
    return agg.selectExpr(
        f"{entity} AS entity", "n_fixes", *_rhythm_out_sql()
    )


def _rhythm_out_sql() -> tuple:
    """Shared (peak_hour_utc, rhythm) projection over
    (n_fixes, sc, ss)."""
    s = f"{_VEC_SCALE}.0E0"
    mc = f"(CAST(sc AS DOUBLE) / CAST(n_fixes AS DOUBLE) / {s})"
    ms = f"(CAST(ss AS DOUBLE) / CAST(n_fixes AS DOUBLE) / {s})"
    rbar = f"sqrt({mc} * {mc} + {ms} * {ms})"
    hour = (
        f"(((degrees(atan2({ms}, {mc})) % 360.0E0) + 360.0E0) % 360.0E0) "
        f"/ 15.0E0"
    )
    return (
        f"round(CASE WHEN {rbar} > 0.0E0 THEN {hour} END, 6) "
        f"AS peak_hour_utc",
        f"round({rbar}, 6) AS rhythm",
    )


def daily_rhythm_sql(
    src_sql: str,
    entity: str = "user_id",
    ts_us: str = "ts_us",
) -> str:
    """Oracle twin of :func:`daily_rhythm` (same shared strings)."""
    day = 86_400_000_000
    phase = (
        f"(2.0E0 * pi() * CAST((({ts_us}) % {day} + {day}) % {day} "
        f"AS DOUBLE) / {float(day)!r}E0)"
    )
    s = f"{_VEC_SCALE}.0E0"
    outs = ", ".join(_rhythm_out_sql())
    return (
        f"WITH q AS (SELECT {entity} AS entity, "
        f"CAST(round(cos({phase}) * {s}, 0) AS BIGINT) AS qc, "
        f"CAST(round(sin({phase}) * {s}, 0) AS BIGINT) AS qs "
        f"FROM ({src_sql}) s), "
        f"a AS (SELECT entity, CAST(count(*) AS BIGINT) AS n_fixes, "
        f"CAST(sum(qc) AS BIGINT) AS sc, CAST(sum(qs) AS BIGINT) AS ss "
        f"FROM q GROUP BY entity) "
        f"SELECT entity, n_fixes, {outs} FROM a"
    )


# --------------------------------------- route corridor usage rollup --

def route_usage(
    df: DataFrame,
    route: list,
    max_dist_m: float,
    bin_m: float,
    entity: str = "user_id",
    lon: str = "lon",
    lat: str = "lat",
    R: float = None,
) -> DataFrame:
    """Corridor usage profile along a route: fixes within
    ``max_dist_m`` of the route (see :func:`route_locate`) roll up into
    ``bin_m``-long chainage bins — traffic density, reach, and mean
    lateral offset per route stretch (the linear-referencing analytics
    layer every corridor study runs).

    Binning floors the MM-ROUNDED chainage, so both engines bin the
    identical double; the mean offset sums BIGINT MILLIMETERS
    (order-independent). Plan: route_locate's narrow codegen map (0
    exchanges, the corridor filter at the scan) + ONE hash aggregation
    (count-distinct adds Spark's standard two-phase expand, still one
    logical rollup bounded by bins). Output: (chain_bin, bin_start_m,
    n_fixes, n_users, mean_offset_m).
    """
    if not bin_m > 0:
        raise ValueError(f"bin_m must be positive, got {bin_m}")
    from .crs import _pf

    located = route_locate(
        df, route, max_dist_m=max_dist_m, lon=lon, lat=lat, R=R
    )
    b = located.selectExpr(
        f"{entity} AS entity",
        f"CAST(floor(route_pos_m / {_pf(bin_m)}) AS BIGINT) AS chain_bin",
        "CAST(round(route_dist_m * 1000.0E0, 0) AS BIGINT) AS off_mm",
    )
    return b.groupBy("chain_bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_fixes"),
        F.countDistinct("entity").cast("bigint").alias("n_users"),
        F.sum("off_mm").cast("bigint").alias("_mm"),
    ).selectExpr(
        "chain_bin",
        f"CAST(chain_bin AS DOUBLE) * {_pf(bin_m)} AS bin_start_m",
        "n_fixes", "n_users",
        "round(CAST(_mm AS DOUBLE) / 1000.0E0 "
        "/ CAST(n_fixes AS DOUBLE), 6) AS mean_offset_m",
    )


def route_usage_sql(
    src_sql: str,
    route: list,
    max_dist_m: float,
    bin_m: float,
    entity: str = "user_id",
    lon: str = "lon",
    lat: str = "lat",
    R: float = None,
) -> str:
    """Oracle twin of :func:`route_usage` over the shared
    :func:`route_locate_sql` projection."""
    if not bin_m > 0:
        raise ValueError(f"bin_m must be positive, got {bin_m}")
    from .crs import _pf

    loc = route_locate_sql(
        src_sql, route, max_dist_m=max_dist_m, lon=lon, lat=lat, R=R
    )
    return (
        f"WITH loc AS ({loc}), "
        f"b AS (SELECT {entity} AS entity, "
        f"CAST(floor(route_pos_m / {_pf(bin_m)}) AS BIGINT) "
        f"AS chain_bin, "
        f"CAST(round(route_dist_m * 1000.0E0, 0) AS BIGINT) AS off_mm "
        f"FROM loc), "
        f"g AS (SELECT chain_bin, CAST(count(*) AS BIGINT) AS n_fixes, "
        f"CAST(count(DISTINCT entity) AS BIGINT) AS n_users, "
        f"CAST(sum(off_mm) AS BIGINT) AS _mm FROM b GROUP BY chain_bin) "
        f"SELECT chain_bin, "
        f"CAST(chain_bin AS DOUBLE) * {_pf(bin_m)} AS bin_start_m, "
        f"n_fixes, n_users, "
        f"round(CAST(_mm AS DOUBLE) / 1000.0E0 "
        f"/ CAST(n_fixes AS DOUBLE), 6) AS mean_offset_m FROM g"
    )


# ------------------------------------ cell transition matrix (Markov) --

def cell_transitions(
    df: DataFrame,
    cell_deg: float,
    min_count: int = 1,
    entity: str = "user_id",
    ts_us: str = "ts_us",
    seq: str = "event_id",
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Fix-level cell-to-cell transition counts — the first-order
    mobility Markov model (next-location prediction's sufficient
    statistic). Each consecutive-fix pair whose cells DIFFER counts one
    transition; self-loops (both fixes in one cell) are excluded —
    they measure sampling rate, not movement. Unlike :func:`od_flows`
    (trips between long dwells) this is the raw per-step chain.

    Output: (from_cx, from_cy, to_cx, to_cy, n_trans, n_entities) for
    transitions with ``n_trans >= min_count`` — the count floor is the
    privacy/noise gate every published mobility matrix applies.

    Plan: ONE hashpartitioning(entity) lag window, then one hash
    aggregate to the transition grain (count-distinct entities adds the
    standard two-phase expand). Exact integers throughout.
    """
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    from .cluster import cell_id_sql

    _, cx, cy = cell_id_sql(cell_deg, lon, lat)
    w = Window.partitionBy(entity).orderBy("_t", "_s")
    p = df.selectExpr(
        entity, f"{ts_us} AS _t", f"{seq} AS _s",
        f"{cx} AS tcx", f"{cy} AS tcy",
    ).select(
        F.col(entity),
        F.col("tcx"), F.col("tcy"),
        F.lag("tcx").over(w).alias("fcx"),
        F.lag("tcy").over(w).alias("fcy"),
    ).filter(
        F.col("fcx").isNotNull()
        & ~((F.col("fcx") == F.col("tcx")) & (F.col("fcy") == F.col("tcy")))
    )
    return p.groupBy(
        F.col("fcx").alias("from_cx"), F.col("fcy").alias("from_cy"),
        F.col("tcx").alias("to_cx"), F.col("tcy").alias("to_cy"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_trans"),
        F.countDistinct(entity).cast("bigint").alias("n_entities"),
    ).filter(F.col("n_trans") >= int(min_count))


def cell_transitions_sql(
    src_sql: str,
    cell_deg: float,
    min_count: int = 1,
    entity: str = "user_id",
    ts_us: str = "ts_us",
    seq: str = "event_id",
    lon: str = "lon",
    lat: str = "lat",
) -> str:
    """Oracle twin of :func:`cell_transitions`."""
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    from .cluster import cell_id_sql

    _, cx, cy = cell_id_sql(cell_deg, lon, lat)
    return (
        f"WITH c AS (SELECT {entity} AS entity, {ts_us} AS t, "
        f"{seq} AS s, {cx} AS tcx, {cy} AS tcy FROM ({src_sql}) q), "
        f"l AS (SELECT entity, tcx, tcy, lag(tcx) OVER w AS fcx, "
        f"lag(tcy) OVER w AS fcy FROM c "
        f"WINDOW w AS (PARTITION BY entity ORDER BY t, s)), "
        f"tr AS (SELECT * FROM l WHERE fcx IS NOT NULL "
        f"AND NOT (fcx = tcx AND fcy = tcy)) "
        f"SELECT fcx AS from_cx, fcy AS from_cy, tcx AS to_cx, "
        f"tcy AS to_cy, CAST(count(*) AS BIGINT) AS n_trans, "
        f"CAST(count(DISTINCT entity) AS BIGINT) AS n_entities "
        f"FROM tr GROUP BY 1, 2, 3, 4 "
        f"HAVING count(*) >= {int(min_count)}"
    )


# ----------------------------- Knox space-time interaction test --

def knox_test(
    df: DataFrame,
    delta_m: float,
    tau_us: int,
    cell_deg: float,
    lat_max: float,
    eid: str = "event_id",
    ts_us: str = "ts_us",
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Knox space-time interaction test (Knox 1964 — the classic
    epidemiology statistic): do events that are close in SPACE tend to
    also be close in TIME? Over all event pairs in the study band:

        X = #{pairs close in both},  S = #{close in space},
        T = #{close in time},        P = n(n-1)/2
        knox_ratio = X * P / (S * T)   (1 under independence)

    Exact counts, never a corpus cross product: the spatial counts use
    the co-location 3x3 bucket cover (validated complete by
    :func:`_coloc_params` — the same parameters' brute-force oracle in
    the registry proves the cover); the temporal count uses the
    +/-1 tau-bucket window; every pair is found exactly once because
    the (db) / (dx, dy) offsets are unique per pair. The registry
    ORACLE replays all four counts as brute-force self-joins with NO
    bucketing, so an incomplete cover fails parity.

    Output: one row (n_events, pairs_space, pairs_time, pairs_both,
    expected_both, knox_ratio), floats round(.,6).
    """
    nx, T = _coloc_params(delta_m, tau_us, cell_deg, lat_max)
    from .cluster import cell_id_sql
    from .crs import _pf

    _, cx, cy = cell_id_sql(cell_deg, lon, lat)
    pm = f"((({ts_us}) % {T} + {T}) % {T})"
    base = df.filter(F.expr(f"abs({lat}) <= {_pf(lat_max)}")).selectExpr(
        f"{eid} AS e", f"{ts_us} AS t", f"{lon} AS lo", f"{lat} AS la",
        f"{cx} AS cx", f"{cy} AS cy",
        f"CAST((({ts_us}) - {pm}) / {T} AS BIGINT) AS tb",
    )
    n_df = base.agg(F.count(F.lit(1)).cast("bigint").alias("n"))

    # spatial pairs: 3x3 bucket cover, exact haversine keep rule
    soffs = ", ".join(
        f"struct({dx} AS dx, {dy} AS dy)"
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)
    )
    sa = base.selectExpr(
        "e AS ea", "t AS ta", "lo AS loa", "la AS laa",
        "cx", "cy", f"explode(array({soffs})) AS o",
    ).selectExpr(
        "ea", "ta", "loa", "laa",
        f"((cx + o.dx + {nx}) % {nx}) AS jx", "(cy + o.dy) AS jy",
    )
    sb = base.selectExpr(
        "e AS eb", "t AS tc", "lo AS lob", "la AS lab",
        "cx AS jx", "cy AS jy",
    )
    hav = haversine_m_sql("loa", "laa", "lob", "lab")
    spairs = (
        sa.join(sb, ["jx", "jy"])
        .filter(F.expr(
            f"ea < eb AND round({hav}, {_ND}) <= {_pf(delta_m)}"
        ))
    )
    # ONE aggregation yields both spatial counts — the bucket join +
    # per-candidate haversine is the operator's dominant cost and must
    # not run twice
    sb_cnt = spairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("pairs_space"),
        F.expr(
            f"CAST(sum(CASE WHEN abs(tc - ta) <= {T} THEN 1 ELSE 0 "
            f"END) AS BIGINT)"
        ).alias("pairs_both"),
    )

    # temporal pairs: +/-1 tau-bucket window
    ta_ = base.selectExpr(
        "e AS ea", "t AS ta", "explode(array(-1, 0, 1)) AS db", "tb",
    ).selectExpr("ea", "ta", "(tb + db) AS jb")
    tb_ = base.selectExpr("e AS eb", "t AS tc", "tb AS jb")
    t_cnt = (
        ta_.join(tb_, ["jb"])
        .filter(F.expr(f"ea < eb AND abs(tc - ta) <= {T}"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("pairs_time"))
    )

    return (
        n_df.crossJoin(F.broadcast(sb_cnt))
        .crossJoin(F.broadcast(t_cnt))
        .selectExpr(
            "n AS n_events", "pairs_space", "pairs_time", "pairs_both",
            *_knox_out_sql(),
        )
    )


def _knox_out_sql() -> tuple:
    """Shared (expected_both, knox_ratio) projection over
    (n, pairs_space, pairs_time, pairs_both)."""
    p = "(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0E0) / 2.0E0)"
    return (
        f"round(CAST(pairs_space AS DOUBLE) "
        f"* CAST(pairs_time AS DOUBLE) / nullif({p}, 0.0E0), 6) "
        f"AS expected_both",
        f"round(CAST(pairs_both AS DOUBLE) * {p} "
        f"/ nullif(CAST(pairs_space AS DOUBLE) "
        f"* CAST(pairs_time AS DOUBLE), 0.0E0), 6) AS knox_ratio",
    )


def knox_test_sql(
    src_sql: str,
    delta_m: float,
    tau_us: int,
    cell_deg: float,
    lat_max: float,
    eid: str = "event_id",
    ts_us: str = "ts_us",
    lon: str = "lon",
    lat: str = "lat",
) -> str:
    """BRUTE-FORCE oracle twin of :func:`knox_test`: all four counts as
    un-bucketed self-joins (time via a range predicate DuckDB plans as
    an IEJoin; space as the full pair scan) — independently proving the
    engine's bucket covers are complete."""
    _coloc_params(delta_m, tau_us, cell_deg, lat_max)
    from .crs import _pf

    T = int(tau_us)
    hav = haversine_m_sql("a.lo", "a.la", "b.lo", "b.la")
    keep = f"round({hav}, {_ND}) <= {_pf(delta_m)}"
    return (
        f"WITH e AS (SELECT {eid} AS e, {ts_us} AS t, {lon} AS lo, "
        f"{lat} AS la FROM ({src_sql}) s "
        f"WHERE abs({lat}) <= {_pf(lat_max)}), "
        f"nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM e), "
        f"sp AS (SELECT CAST(count(*) AS BIGINT) AS pairs_space "
        f"FROM e a JOIN e b ON a.e < b.e WHERE {keep}), "
        f"tp AS (SELECT CAST(count(*) AS BIGINT) AS pairs_time "
        f"FROM e a JOIN e b ON a.e < b.e "
        f"AND b.t BETWEEN a.t - {T} AND a.t + {T}), "
        f"bp AS (SELECT CAST(count(*) AS BIGINT) AS pairs_both "
        f"FROM e a JOIN e b ON a.e < b.e "
        f"AND b.t BETWEEN a.t - {T} AND a.t + {T} WHERE {keep}) "
        f"SELECT n AS n_events, pairs_space, pairs_time, pairs_both, "
        + ", ".join(_knox_out_sql())
        + " FROM nn CROSS JOIN sp CROSS JOIN tp CROSS JOIN bp"
    )


# --------------------------------------- Ripley's K / L function --

def _ripley_params(
    radii_m: list, cell_deg: float, lat_max: float
) -> tuple:
    """Validate radii (positive, strictly ascending) and the bucket
    cover at max(radii) — same complete-cover argument as the
    co-location family (:func:`_coloc_params`; tau is irrelevant for a
    pure spatial count, passed as 1). Returns (nx, radii as floats,
    band area in m²): A = 4πR²·sin(lat_max), the exact sphere-band
    area the K estimator normalizes by."""
    import math as _m

    from .crs import R_SPHERE

    rs = [float(r) for r in radii_m]
    if not rs:
        raise ValueError("radii_m must be non-empty")
    if any(r <= 0 for r in rs) or any(
        b <= a for a, b in zip(rs, rs[1:])
    ):
        raise ValueError(
            f"radii_m must be positive and strictly ascending, "
            f"got {radii_m}"
        )
    nx, _ = _coloc_params(rs[-1], 1, cell_deg, lat_max)
    area = 4.0 * _m.pi * R_SPHERE * R_SPHERE * _m.sin(
        _m.radians(lat_max)
    )
    return nx, rs, area


def _ripley_out_sql(area: float) -> tuple:
    """Shared projection over (r_m, n, pairs_within): the naive
    (uncorrected) K estimate K̂(r) = A·2·p / (n(n−1)) and the variance-
    stabilized L̂(r) = √(K̂/π) − r (L ≈ 0 under CSR, > 0 clustered).
    NULL for n < 2."""
    from .crs import _pf

    nn1 = "(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0E0))"
    k = (
        f"({_pf(area)} * 2.0E0 * CAST(pairs_within AS DOUBLE) "
        f"/ nullif({nn1}, 0.0E0))"
    )
    pi = "3.14159265358979312E0"
    return (
        f"round({k}, 6) AS k_hat",
        f"round(sqrt({k} / {pi}) - r_m, 6) AS l_hat",
    )


def ripley_k(
    df: DataFrame,
    radii_m: list,
    cell_deg: float,
    lat_max: float,
    eid: str = "event_id",
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Ripley's K function (Ripley 1976 — the multi-scale point-pattern
    statistic; the distance-domain complement of the quadrat test):
    K̂(r) = A/(n(n−1)) · Σ_{i≠j} 1(d_ij ≤ r) for each requested radius,
    over the study band |lat| <= lat_max, plus the variance-stabilized
    L̂(r) = √(K̂/π) − r. NAIVE estimator: no edge correction — the lon
    dimension wraps (no seam edge) and the lat truncation at ±lat_max
    biases K̂ down only for points within max(radii) of the band edge
    (Ripley's isotropic correction needs per-pair boundary geometry;
    out of scope, documented).

    Exact pair counts, never a corpus cross product: the 3x3 bucket
    cover at cell width >= max(radii) is validated complete
    (:func:`_ripley_params`), every qualifying pair found EXACTLY once
    (offset uniqueness, the co-location argument), and ALL radii share
    the ONE candidate join — per-radius counts are conditional sums in
    a single aggregation, unpivoted by a bounded literal explode.

    Output: one row per radius (r_m, n_events, pairs_within, k_hat,
    l_hat), floats round(.,6).
    """
    nx, rs, area = _ripley_params(radii_m, cell_deg, lat_max)
    from .cluster import cell_id_sql
    from .crs import _pf

    _, cx, cy = cell_id_sql(cell_deg, lon, lat)
    base = df.filter(F.expr(f"abs({lat}) <= {_pf(lat_max)}")).selectExpr(
        f"{eid} AS e", f"{lon} AS lo", f"{lat} AS la",
        f"{cx} AS cx", f"{cy} AS cy",
    )
    n_df = base.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    soffs = ", ".join(
        f"struct({dx} AS dx, {dy} AS dy)"
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)
    )
    a = base.selectExpr(
        "e AS ea", "lo AS loa", "la AS laa",
        "cx", "cy", f"explode(array({soffs})) AS o",
    ).selectExpr(
        "ea", "loa", "laa",
        f"((cx + o.dx + {nx}) % {nx}) AS jx", "(cy + o.dy) AS jy",
    )
    b = base.selectExpr(
        "e AS eb", "lo AS lob", "la AS lab", "cx AS jx", "cy AS jy",
    )
    hav = haversine_m_sql("loa", "laa", "lob", "lab")
    sums = (
        a.join(b, ["jx", "jy"])
        .filter(F.expr(
            f"ea < eb AND round({hav}, {_ND}) <= {_pf(rs[-1])}"
        ))
        .selectExpr(f"round({hav}, {_ND}) AS d")
        .agg(*[
            F.expr(
                f"CAST(coalesce(sum(CASE WHEN d <= {_pf(r)} THEN 1 "
                f"ELSE 0 END), 0) AS BIGINT)"
            ).alias(f"p{i}")
            for i, r in enumerate(rs)
        ])
    )
    stack = ", ".join(
        f"struct(CAST({_pf(r)} AS DOUBLE) AS r_m, p{i} AS pairs_within)"
        for i, r in enumerate(rs)
    )
    return (
        sums.crossJoin(F.broadcast(n_df))
        .selectExpr(f"explode(array({stack})) AS s", "n")
        .selectExpr("s.r_m AS r_m", "n", "s.pairs_within AS pairs_within")
        .selectExpr(
            "r_m", "n AS n_events", "pairs_within",
            *_ripley_out_sql(area),
        )
    )


def ripley_k_sql(
    src_sql: str,
    radii_m: list,
    cell_deg: float,
    lat_max: float,
    eid: str = "event_id",
    lon: str = "lon",
    lat: str = "lat",
) -> str:
    """BRUTE-FORCE oracle twin of :func:`ripley_k`: the full un-bucketed
    pair scan (filtered to max(radii) inside the pair CTE so only
    qualifying pairs materialize), per-radius counts via a VALUES radii
    table LEFT-joined on d <= r — independently proving the engine's
    bucket cover is complete. Quadratic by design: sf0.01-sized, like
    the knox oracle."""
    nx, rs, area = _ripley_params(radii_m, cell_deg, lat_max)
    from .crs import _pf

    hav = haversine_m_sql("a.lo", "a.la", "b.lo", "b.la")
    vals = ", ".join(f"({_pf(r)})" for r in rs)
    return (
        f"WITH e AS (SELECT {eid} AS e, {lon} AS lo, {lat} AS la "
        f"FROM ({src_sql}) s WHERE abs({lat}) <= {_pf(lat_max)}), "
        f"nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM e), "
        f"pr AS (SELECT round({hav}, {_ND}) AS d "
        f"FROM e a JOIN e b ON a.e < b.e "
        f"WHERE round({hav}, {_ND}) <= {_pf(rs[-1])}), "
        f"rt AS (SELECT CAST(v AS DOUBLE) AS r_m "
        f"FROM (VALUES {vals}) t(v)), "
        f"agg AS (SELECT r_m, CAST(count(d) AS BIGINT) AS pairs_within "
        f"FROM rt LEFT JOIN pr ON d <= r_m GROUP BY r_m) "
        f"SELECT r_m, n AS n_events, pairs_within, "
        + ", ".join(_ripley_out_sql(area))
        + " FROM agg CROSS JOIN nn"
    )


# ----------------------- pair correlation function (O-ring) g(r) --


def _pcf_params(
    edges_m: list, cell_deg: float, lat_max: float
) -> tuple:
    """Validate ring edges (first >= 0, strictly ascending, >= 2
    edges) and the bucket cover at the outermost edge (the Ripley /
    co-location argument). Returns (nx, edges as floats, band area A,
    per-ring spherical annulus areas a_i): the exact sphere ring area
    around a point, a_i = 2πR²(cos(lo/R) − cos(hi/R)), is a
    COMPILE-TIME Python constant per bin — no transcendental ever
    reaches SQL — and reduces to the planar π(hi²−lo²) for small r."""
    import math as _m

    from .crs import R_SPHERE

    es = [float(e) for e in edges_m]
    if len(es) < 2:
        raise ValueError("edges_m needs >= 2 edges (>= 1 ring)")
    if es[0] < 0 or any(b <= a for a, b in zip(es, es[1:])):
        raise ValueError(
            f"edges_m must be non-negative and strictly ascending, "
            f"got {edges_m}"
        )
    nx, _ = _coloc_params(es[-1], 1, cell_deg, lat_max)
    area = 4.0 * _m.pi * R_SPHERE * R_SPHERE * _m.sin(
        _m.radians(lat_max)
    )
    rings = [
        2.0 * _m.pi * R_SPHERE * R_SPHERE
        * (_m.cos(lo / R_SPHERE) - _m.cos(hi / R_SPHERE))
        for lo, hi in zip(es, es[1:])
    ]
    return nx, es, area, rings


def _pcf_out_sql(area: float, rings: list) -> str:
    """Shared g_hat projection over (bin, pairs_in_ring, n): the
    ratio-to-CSR estimate ĝ_i = A·2·p_i / (n(n−1)·a_i) — observed
    ordered pairs per point in ring i over the CSR expectation
    (n−1)·a_i/A. Under CSR ĝ ≈ 1; > 1 means excess structure AT that
    scale (the K function's cumulative form hides which scale). The
    per-ring 1/a_i constants fold into one Python-computed literal
    A/a_i per bin, dispatched by a bounded CASE. NULL for n < 2."""
    from .crs import _pf

    nn1 = "(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0E0))"
    ratio = " ".join(
        f"WHEN bin = {i} THEN {_pf(area / a)}"
        for i, a in enumerate(rings)
    )
    return (
        f"round((CASE {ratio} END) * 2.0E0 "
        f"* CAST(pairs_in_ring AS DOUBLE) / nullif({nn1}, 0.0E0), 6) "
        f"AS g_hat"
    )


def pair_correlation(
    df: DataFrame,
    edges_m: list,
    cell_deg: float,
    lat_max: float,
    eid: str = "event_id",
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Pair correlation function g(r) (the O-ring statistic, Wiegand &
    Moloney 2004; spatstat's ``pcf``) — the NON-cumulative companion to
    :func:`ripley_k`: pair counts in half-open distance rings
    (lo, hi], normalized so CSR gives ĝ ≈ 1 at every scale. K(r) is
    cumulative, so clustering at 50 km bleeds into every K(r > 50 km);
    g(r) isolates the scale — the reason spatstat recommends reading g
    before K (reference has neither; this extends its spatial family).

    Estimator: ĝ_i = A·2·ring_i / (n(n−1)·a_i) with a_i the EXACT
    spherical annulus area 2πR²(cos(lo/R) − cos(hi/R)) (a compile-time
    Python constant; reduces to planar π(hi²−lo²) at small r). Naive
    (no edge correction), like ripley_k: lon wraps seam-free, the lat
    truncation at ±lat_max biases rings near the band edge down
    (documented there). Exact counts, never a corpus cross product:
    the 3x3 bucket cover at cell width >= edges[-1] is validated
    complete, every pair found EXACTLY once, and ALL rings share the
    ONE candidate join — per-ring counts are conditional sums in a
    single aggregation, unpivoted by a bounded literal explode.
    Co-located pairs (d = 0) fall in no ring when edges[0] = 0 (the
    semivariogram bin-0 convention; dedup upstream owns them).

    Output: one row per ring (r_lo, r_hi, n_events, pairs_in_ring,
    g_hat), floats round(.,6).
    """
    nx, es, area, rings = _pcf_params(edges_m, cell_deg, lat_max)
    from .cluster import cell_id_sql
    from .crs import _pf

    _, cx, cy = cell_id_sql(cell_deg, lon, lat)
    base = df.filter(F.expr(f"abs({lat}) <= {_pf(lat_max)}")).selectExpr(
        f"{eid} AS e", f"{lon} AS lo", f"{lat} AS la",
        f"{cx} AS cx", f"{cy} AS cy",
    )
    n_df = base.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    soffs = ", ".join(
        f"struct({dx} AS dx, {dy} AS dy)"
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)
    )
    a = base.selectExpr(
        "e AS ea", "lo AS loa", "la AS laa",
        "cx", "cy", f"explode(array({soffs})) AS o",
    ).selectExpr(
        "ea", "loa", "laa",
        f"((cx + o.dx + {nx}) % {nx}) AS jx", "(cy + o.dy) AS jy",
    )
    b = base.selectExpr(
        "e AS eb", "lo AS lob", "la AS lab", "cx AS jx", "cy AS jy",
    )
    hav = haversine_m_sql("loa", "laa", "lob", "lab")
    sums = (
        a.join(b, ["jx", "jy"])
        .filter(F.expr(
            f"ea < eb AND round({hav}, {_ND}) <= {_pf(es[-1])} "
            f"AND round({hav}, {_ND}) > {_pf(es[0])}"
        ))
        .selectExpr(f"round({hav}, {_ND}) AS d")
        .agg(*[
            F.expr(
                f"CAST(coalesce(sum(CASE WHEN d > {_pf(lo)} "
                f"AND d <= {_pf(hi)} THEN 1 ELSE 0 END), 0) AS BIGINT)"
            ).alias(f"p{i}")
            for i, (lo, hi) in enumerate(zip(es, es[1:]))
        ])
    )
    stack = ", ".join(
        f"struct({i} AS bin, CAST({_pf(lo)} AS DOUBLE) AS r_lo, "
        f"CAST({_pf(hi)} AS DOUBLE) AS r_hi, p{i} AS pairs_in_ring)"
        for i, (lo, hi) in enumerate(zip(es, es[1:]))
    )
    return (
        sums.crossJoin(F.broadcast(n_df))
        .selectExpr(f"explode(array({stack})) AS s", "n")
        .selectExpr(
            "s.bin AS bin", "s.r_lo AS r_lo", "s.r_hi AS r_hi",
            "n", "s.pairs_in_ring AS pairs_in_ring",
        )
        .selectExpr(
            "r_lo", "r_hi", "n AS n_events", "pairs_in_ring",
            _pcf_out_sql(area, rings),
        )
    )


def pair_correlation_sql(
    src_sql: str,
    edges_m: list,
    cell_deg: float,
    lat_max: float,
    eid: str = "event_id",
    lon: str = "lon",
    lat: str = "lat",
) -> str:
    """BRUTE-FORCE oracle twin of :func:`pair_correlation`: the full
    un-bucketed pair scan, per-ring counts via a VALUES ring table
    LEFT-joined on lo < d <= hi — independently proving the engine's
    bucket cover complete. Quadratic by design: sf0.01-sized, like the
    ripley/knox oracles."""
    nx, es, area, rings = _pcf_params(edges_m, cell_deg, lat_max)
    from .crs import _pf

    hav = haversine_m_sql("a.lo", "a.la", "b.lo", "b.la")
    vals = ", ".join(
        f"({i}, {_pf(lo)}, {_pf(hi)})"
        for i, (lo, hi) in enumerate(zip(es, es[1:]))
    )
    return (
        f"WITH e AS (SELECT {eid} AS e, {lon} AS lo, {lat} AS la "
        f"FROM ({src_sql}) s WHERE abs({lat}) <= {_pf(lat_max)}), "
        f"nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM e), "
        f"pr AS (SELECT round({hav}, {_ND}) AS d "
        f"FROM e a JOIN e b ON a.e < b.e "
        f"WHERE round({hav}, {_ND}) <= {_pf(es[-1])} "
        f"AND round({hav}, {_ND}) > {_pf(es[0])}), "
        f"rt AS (SELECT CAST(i AS INT) AS bin, "
        f"CAST(lo AS DOUBLE) AS r_lo, CAST(hi AS DOUBLE) AS r_hi "
        f"FROM (VALUES {vals}) t(i, lo, hi)), "
        f"agg AS (SELECT bin, r_lo, r_hi, "
        f"CAST(count(d) AS BIGINT) AS pairs_in_ring "
        f"FROM rt LEFT JOIN pr ON d > r_lo AND d <= r_hi "
        f"GROUP BY 1, 2, 3) "
        f"SELECT r_lo, r_hi, n AS n_events, pairs_in_ring, "
        + _pcf_out_sql(area, rings)
        + " FROM agg CROSS JOIN nn"
    )


# ------------------------- standard deviational ellipse (per entity) --

_SDE_SCALE = 100_000  # 1e-5 deg (~1.1 m) fixed-point moment quantum


def _sde_prep_sql(lon: str, lat: str) -> tuple:
    """(dx, dy) fixed-point deviation expressions given per-entity
    anchor columns ``rlon``/``rlat`` (the entity's min lon/lat). The
    lon delta is WRAPPED into [-180, 180) before quantizing, so a home
    straddling the antimeridian (min lon ~ -179.9, points at +179.9)
    yields small deviations, not a 360-degree smear. floor() of shared
    doubles is engine-identical; all moments are then BIGINT-exact.
    Headroom: n·(span·1e5)² must stay under 2^63 — full-globe spread
    (3.6e7 quanta) caps an entity at ~7e3 fixes; localized tracks are
    unbounded in practice."""
    d = f"(({lon}) - rlon)"
    wd = (
        f"((({d} + 180.0E0) - 360.0E0 "
        f"* floor(({d} + 180.0E0) / 360.0E0)) - 180.0E0)"
    )
    dx = f"CAST(floor({wd} * {_SDE_SCALE}.0E0) AS BIGINT)"
    dy = (
        f"CAST(floor((({lat}) - rlat) * {_SDE_SCALE}.0E0) AS BIGINT)"
    )
    return dx, dy


def _sde_out_sql() -> tuple:
    """Shared projection over (n, rlon, rlat, sx, sy, sxx, syy, sxy):
    the ellipse center (anchor + mean deviation, lon re-wrapped), the
    major/minor axis standard deviations (the 2x2 covariance
    eigenvalues — closed form in +,-,*,/,sqrt, all IEEE-exact ops), and
    the major-axis orientation theta = 0.5·atan2(2·Vxy, Vxx−Vyy) in
    degrees east-of-x (NULL when rotation is undefined: Vxy = 0 and
    Vxx = Vyy, e.g. a single fix or an isotropic cloud). Raw standard
    deviations — no ArcGIS sqrt(2) axis inflation, no n−2 dof
    correction (documented convention)."""
    s = f"{_SDE_SCALE}.0E0"
    nn = "CAST(n AS DOUBLE)"
    mx = f"(CAST(sx AS DOUBLE) / {nn})"
    my = f"(CAST(sy AS DOUBLE) / {nn})"
    vxx = f"((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * {mx}) / {nn})"
    vyy = f"((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * {my}) / {nn})"
    vxy = f"((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * {my}) / {nn})"
    half = f"(({vxx} + {vyy}) / 2.0E0)"
    rad = (
        f"sqrt((({vxx} - {vyy}) / 2.0E0) * (({vxx} - {vyy}) / 2.0E0) "
        f"+ {vxy} * {vxy})"
    )
    clon = f"(rlon + {mx} / {s})"
    wlon = (
        f"((({clon} + 180.0E0) - 360.0E0 "
        f"* floor(({clon} + 180.0E0) / 360.0E0)) - 180.0E0)"
    )
    theta = f"(0.5E0 * degrees(atan2(2.0E0 * {vxy}, {vxx} - {vyy})))"
    return (
        f"round({wlon}, 6) AS center_lon",
        f"round(rlat + {my} / {s}, 6) AS center_lat",
        f"round(sqrt(greatest(0.0E0, {half} + {rad})) / {s}, 6) "
        f"AS sigma_major_deg",
        f"round(sqrt(greatest(0.0E0, {half} - {rad})) / {s}, 6) "
        f"AS sigma_minor_deg",
        f"(CASE WHEN {vxy} = 0.0E0 AND {vxx} = {vyy} THEN NULL "
        f"ELSE round({theta}, 6) END) AS theta_deg",
    )


def directional_ellipse(
    df: DataFrame,
    entity: str = "user_id",
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Per-entity standard deviational ellipse (Lefever 1926; the
    ArcGIS "Directional Distribution" statistic) — the directional
    sibling of :func:`gyration_radius`: mean center, the covariance
    eigen-axes (major/minor standard deviations), and the major-axis
    orientation of each entity's fix cloud, in a local planar frame
    anchored at the entity's (min lon, min lat) with the lon delta
    seam-wrapped.

    Plan: ONE hashpartitioning(entity) exchange — the anchor min is an
    unbounded window over entity and the moment aggregation groups on
    the SAME column, so the window's partitioning is reused (the
    early-alias trap documented in PLANS r4s22). Six BIGINT-exact
    moments; everything after is closed-form doubles.

    Output: (entity, n_fixes, center_lon, center_lat, sigma_major_deg,
    sigma_minor_deg, theta_deg), floats round(.,6).
    """
    w = Window.partitionBy(entity)
    anchored = df.select(
        F.col(entity),
        F.col(lon).alias("_lon"),
        F.col(lat).alias("_lat"),
        F.min(lon).over(w).alias("rlon"),
        F.min(lat).over(w).alias("rlat"),
    )
    dx, dy = _sde_prep_sql("_lon", "_lat")
    prepped = anchored.selectExpr(
        entity, "rlon", "rlat", f"{dx} AS dx", f"{dy} AS dy",
    )
    mom = prepped.groupBy(entity).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.first("rlon").alias("rlon"),
        F.first("rlat").alias("rlat"),
        F.sum("dx").cast("bigint").alias("sx"),
        F.sum("dy").cast("bigint").alias("sy"),
        F.sum(F.col("dx") * F.col("dx")).cast("bigint").alias("sxx"),
        F.sum(F.col("dy") * F.col("dy")).cast("bigint").alias("syy"),
        F.sum(F.col("dx") * F.col("dy")).cast("bigint").alias("sxy"),
    )
    return mom.selectExpr(
        entity, "n AS n_fixes", *_sde_out_sql(),
    )


def directional_ellipse_sql(
    src_sql: str,
    entity: str = "user_id",
    lon: str = "lon",
    lat: str = "lat",
) -> str:
    """Oracle twin of :func:`directional_ellipse` (same window-min
    anchor, same fixed-point moments, same closed-form projection)."""
    dx, dy = _sde_prep_sql(lon, lat)
    return (
        f"WITH a AS (SELECT {entity} AS entity, {lon} AS {lon}, "
        f"{lat} AS {lat}, "
        f"min({lon}) OVER (PARTITION BY {entity}) AS rlon, "
        f"min({lat}) OVER (PARTITION BY {entity}) AS rlat "
        f"FROM ({src_sql}) s), "
        f"p AS (SELECT entity, rlon, rlat, {dx} AS dx, {dy} AS dy "
        f"FROM a), "
        f"m AS (SELECT entity, CAST(count(*) AS BIGINT) AS n, "
        f"min(rlon) AS rlon, min(rlat) AS rlat, "
        f"CAST(sum(dx) AS BIGINT) AS sx, "
        f"CAST(sum(dy) AS BIGINT) AS sy, "
        f"CAST(sum(dx * dx) AS BIGINT) AS sxx, "
        f"CAST(sum(dy * dy) AS BIGINT) AS syy, "
        f"CAST(sum(dx * dy) AS BIGINT) AS sxy "
        f"FROM p GROUP BY entity) "
        f"SELECT entity AS {entity}, n AS n_fixes, "
        + ", ".join(_sde_out_sql())
        + " FROM m"
    )


def ripley_cross_k(
    df: DataFrame,
    a_pred: str,
    b_pred: str,
    radii_m: list,
    cell_deg: float,
    lat_max: float,
    eid: str = "event_id",
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Bivariate (cross-type) Ripley K (Lotwick & Silverman 1982) —
    the point-pattern sibling of bivariate Moran's I: does event class
    A cluster AROUND class B beyond chance? K̂_ab(r) =
    A·Σ_{i∈a, j∈b} 1(d_ij ≤ r) / (n_a·n_b) per radius, naive
    (uncorrected) like :func:`ripley_k`; L̂_ab = √(K̂_ab/π) − r.

    Classes come from SQL predicates over the input columns (rows
    matching neither are ignored; a row matching BOTH would be
    self-paired at d = 0 — the predicates must be disjoint, validated
    at runtime by a loud CASE failure if any row matches both). The
    bucketed join replicates only the (usually smaller) A side into
    its 3x3 window; B stays home — cross pairs are ordered (a, b), so
    there is no self-pair dedup and each qualifying pair is found
    exactly once by the cover argument.

    Output: one row per radius (r_m, n_a, n_b, pairs_ab, k_ab, l_ab).
    """
    nx, rs, area = _ripley_params(radii_m, cell_deg, lat_max)
    from .cluster import cell_id_sql
    from .crs import _pf

    _, cx, cy = cell_id_sql(cell_deg, lon, lat)
    cls = (
        f"(CASE WHEN ({a_pred}) AND ({b_pred}) THEN "
        f"CAST(raise_error('ripley_cross_k: predicates overlap') "
        f"AS INT) "
        f"WHEN ({a_pred}) THEN 1 WHEN ({b_pred}) THEN 2 END)"
    )
    base = (
        df.filter(F.expr(f"abs({lat}) <= {_pf(lat_max)}"))
        .selectExpr(
            f"{eid} AS e", f"{lon} AS lo", f"{lat} AS la",
            f"{cx} AS cx", f"{cy} AS cy", f"{cls} AS cls",
        )
        .filter("cls IS NOT NULL")
    )
    n_df = base.agg(
        F.expr(
            "CAST(coalesce(sum(CASE WHEN cls = 1 THEN 1 ELSE 0 END), "
            "0) AS BIGINT)"
        ).alias("n_a"),
        F.expr(
            "CAST(coalesce(sum(CASE WHEN cls = 2 THEN 1 ELSE 0 END), "
            "0) AS BIGINT)"
        ).alias("n_b"),
    )
    soffs = ", ".join(
        f"struct({dx} AS dx, {dy} AS dy)"
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)
    )
    a = base.filter("cls = 1").selectExpr(
        "lo AS loa", "la AS laa", "cx", "cy",
        f"explode(array({soffs})) AS o",
    ).selectExpr(
        "loa", "laa",
        f"((cx + o.dx + {nx}) % {nx}) AS jx", "(cy + o.dy) AS jy",
    )
    b = base.filter("cls = 2").selectExpr(
        "lo AS lob", "la AS lab", "cx AS jx", "cy AS jy",
    )
    hav = haversine_m_sql("loa", "laa", "lob", "lab")
    sums = (
        a.join(b, ["jx", "jy"])
        .filter(F.expr(f"round({hav}, {_ND}) <= {_pf(rs[-1])}"))
        .selectExpr(f"round({hav}, {_ND}) AS d")
        .agg(*[
            F.expr(
                f"CAST(coalesce(sum(CASE WHEN d <= {_pf(r)} THEN 1 "
                f"ELSE 0 END), 0) AS BIGINT)"
            ).alias(f"p{i}")
            for i, r in enumerate(rs)
        ])
    )
    stack = ", ".join(
        f"struct(CAST({_pf(r)} AS DOUBLE) AS r_m, p{i} AS pairs_ab)"
        for i, r in enumerate(rs)
    )
    nab = "(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))"
    k = (
        f"({_pf(area)} * CAST(pairs_ab AS DOUBLE) "
        f"/ nullif({nab}, 0.0E0))"
    )
    pi = "3.14159265358979312E0"
    return (
        sums.crossJoin(F.broadcast(n_df))
        .selectExpr(f"explode(array({stack})) AS s", "n_a", "n_b")
        .selectExpr(
            "s.r_m AS r_m", "n_a", "n_b", "s.pairs_ab AS pairs_ab",
            f"round({k}, 6) AS k_ab",
            f"round(sqrt({k} / {pi}) - s.r_m, 6) AS l_ab",
        )
    )


def ripley_cross_k_sql(
    src_sql: str,
    a_pred: str,
    b_pred: str,
    radii_m: list,
    cell_deg: float,
    lat_max: float,
    eid: str = "event_id",
    lon: str = "lon",
    lat: str = "lat",
) -> str:
    """BRUTE-FORCE oracle twin of :func:`ripley_cross_k`: the
    un-bucketed A x B pair scan (max-radius filtered in the CTE),
    per-radius counts via the VALUES radii table — proving the cover.
    The overlap guard is replayed as a WHERE that errors via a CASE
    division by zero-free raise: DuckDB lacks raise_error, so the
    oracle asserts disjointness by construction (cls assigns A first;
    a both-matching row would differ from the engine's loud failure —
    acceptable: the REGISTRY predicates are disjoint by definition)."""
    nx, rs, area = _ripley_params(radii_m, cell_deg, lat_max)
    from .crs import _pf

    hav = haversine_m_sql("a.lo", "a.la", "b.lo", "b.la")
    vals = ", ".join(f"({_pf(r)})" for r in rs)
    nab = "(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))"
    k = (
        f"({_pf(area)} * CAST(pairs_ab AS DOUBLE) "
        f"/ nullif({nab}, 0.0E0))"
    )
    pi = "3.14159265358979312E0"
    return (
        f"WITH e AS (SELECT {eid} AS e, {lon} AS lo, {lat} AS la, "
        f"(CASE WHEN ({a_pred}) THEN 1 WHEN ({b_pred}) THEN 2 END) "
        f"AS cls FROM ({src_sql}) s WHERE abs({lat}) <= {_pf(lat_max)}), "
        f"ea AS (SELECT * FROM e WHERE cls = 1), "
        f"eb AS (SELECT * FROM e WHERE cls = 2), "
        f"nn AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM ea) "
        f"AS n_a, (SELECT CAST(count(*) AS BIGINT) FROM eb) AS n_b), "
        f"pr AS (SELECT round({hav}, {_ND}) AS d "
        f"FROM ea a JOIN eb b ON round({hav}, {_ND}) <= {_pf(rs[-1])}), "
        f"rt AS (SELECT CAST(v AS DOUBLE) AS r_m "
        f"FROM (VALUES {vals}) t(v)), "
        f"agg AS (SELECT r_m, CAST(count(d) AS BIGINT) AS pairs_ab "
        f"FROM rt LEFT JOIN pr ON d <= r_m GROUP BY r_m) "
        f"SELECT r_m, n_a, n_b, pairs_ab, "
        f"round({k}, 6) AS k_ab, "
        f"round(sqrt({k} / {pi}) - r_m, 6) AS l_ab "
        f"FROM agg CROSS JOIN nn"
    )


# ------------------------- Clark-Evans nearest-neighbor index --

def _ce_out_sql(area: float, search_r: float) -> tuple:
    """Shared projection over (n, n_nn, snn_mm): the Clark-Evans
    aggregate statistics. lam = n/A uses ALL band points; the observed
    mean NN distance averages the n_nn points whose NN lies within the
    search radius (censoring documented in :func:`nn_index`); SE =
    0.26136/sqrt(n_nn·lam) (Clark & Evans 1954)."""
    from .crs import _pf

    lam = f"(CAST(n AS DOUBLE) / {_pf(area)})"
    mean = (
        f"(CAST(snn_mm AS DOUBLE) / 1000.0E0 "
        f"/ nullif(CAST(n_nn AS DOUBLE), 0.0E0))"
    )
    re = f"(0.5E0 / sqrt({lam}))"
    ce = f"({mean} / {re})"
    se = f"(0.26136E0 / sqrt(CAST(n_nn AS DOUBLE) * {lam}))"
    z = f"(({mean} - {re}) / {se})"
    return (
        f"round(CAST(n_nn AS DOUBLE) / nullif(CAST(n AS DOUBLE), "
        f"0.0E0), 6) AS coverage",
        f"round({mean}, 6) AS mean_nn_m",
        f"round({re}, 6) AS r_expected_m",
        f"round({ce}, 6) AS ce_index",
        f"round({z}, 6) AS z",
        f"(CASE WHEN {z} <= -1.96E0 THEN 'clustered' "
        f"WHEN {z} >= 1.96E0 THEN 'dispersed' "
        f"ELSE 'random' END) AS pattern",
    )


def nn_index(
    df: DataFrame,
    search_r_m: float,
    cell_deg: float,
    lat_max: float,
    eid: str = "event_id",
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Clark-Evans average nearest-neighbor index (Clark & Evans 1954;
    the ArcGIS "Average Nearest Neighbor" tool): the observed mean
    nearest-neighbor distance against the CSR expectation 0.5/√λ over
    the |lat| <= lat_max band, λ = n/A on the sphere band.

    BOUNDED NN search: each point's nearest neighbor is found within
    ``search_r_m`` via the 3x3 bucket cover (validated complete); a
    point with no neighbor inside the radius is CENSORED out of the
    mean (the ``coverage`` column reports the kept fraction — choose
    search_r_m several times r_expected so coverage ~ 1; an unbounded
    exact NN needs expanding-ring search, out of scope and documented).
    The censoring is replayed identically by the brute-force oracle,
    so parity proves the cover finds the true within-radius NN for
    every point. NN distances accumulate as BIGINT millimeters (the
    od_flows convention) — no double summation order anywhere.

    Output: one row (n_events, n_with_neighbor, coverage, mean_nn_m,
    r_expected_m, ce_index, z, pattern); ce < 1 / z <= -1.96 means
    clustered."""
    nx, rs, area = _ripley_params([search_r_m], cell_deg, lat_max)
    from .cluster import cell_id_sql
    from .crs import _pf

    R = rs[0]
    _, cx, cy = cell_id_sql(cell_deg, lon, lat)
    base = df.filter(F.expr(f"abs({lat}) <= {_pf(lat_max)}")).selectExpr(
        f"{eid} AS e", f"{lon} AS lo", f"{lat} AS la",
        f"{cx} AS cx", f"{cy} AS cy",
    )
    n_df = base.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    soffs = ", ".join(
        f"struct({dx} AS dx, {dy} AS dy)"
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)
    )
    a = base.selectExpr(
        "e AS ea", "lo AS loa", "la AS laa",
        "cx", "cy", f"explode(array({soffs})) AS o",
    ).selectExpr(
        "ea", "loa", "laa",
        f"((cx + o.dx + {nx}) % {nx}) AS jx", "(cy + o.dy) AS jy",
    )
    b = base.selectExpr(
        "e AS eb", "lo AS lob", "la AS lab", "cx AS jx", "cy AS jy",
    )
    hav = haversine_m_sql("loa", "laa", "lob", "lab")
    mm = f"CAST(round({hav} * 1000.0E0) AS BIGINT)"
    nn = (
        a.join(b, ["jx", "jy"])
        .filter(F.expr(f"ea != eb AND {mm} <= {int(round(R * 1000))}"))
        .selectExpr("ea", f"{mm} AS d_mm")
        .groupBy("ea")
        .agg(F.min("d_mm").alias("nn_mm"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_nn"),
            F.expr(
                "CAST(coalesce(sum(nn_mm), 0) AS BIGINT)"
            ).alias("snn_mm"),
        )
    )
    return n_df.crossJoin(F.broadcast(nn)).selectExpr(
        "n AS n_events", "n_nn AS n_with_neighbor",
        *_ce_out_sql(area, R),
    )


def nn_index_sql(
    src_sql: str,
    search_r_m: float,
    cell_deg: float,
    lat_max: float,
    eid: str = "event_id",
    lon: str = "lon",
    lat: str = "lat",
) -> str:
    """BRUTE-FORCE oracle twin of :func:`nn_index`: per-point min
    distance over the full un-bucketed pair scan with the same
    <= search_r censoring — proving the bucketed NN is the true
    within-radius NN for every point. Quadratic by design
    (sf0.01-sized, like knox/ripley)."""
    nx, rs, area = _ripley_params([search_r_m], cell_deg, lat_max)
    from .crs import _pf

    R = rs[0]
    hav = haversine_m_sql("a.lo", "a.la", "b.lo", "b.la")
    mm = f"CAST(round({hav} * 1000.0E0) AS BIGINT)"
    return (
        f"WITH e AS (SELECT {eid} AS e, {lon} AS lo, {lat} AS la "
        f"FROM ({src_sql}) s WHERE abs({lat}) <= {_pf(lat_max)}), "
        f"nn0 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM e), "
        f"mins AS (SELECT a.e AS ea, min({mm}) AS nn_mm "
        f"FROM e a JOIN e b ON a.e != b.e "
        f"WHERE {mm} <= {int(round(R * 1000))} GROUP BY a.e), "
        f"agg AS (SELECT CAST(count(*) AS BIGINT) AS n_nn, "
        f"CAST(coalesce(sum(nn_mm), 0) AS BIGINT) AS snn_mm "
        f"FROM mins) "
        f"SELECT n AS n_events, n_nn AS n_with_neighbor, "
        + ", ".join(_ce_out_sql(area, R))
        + " FROM nn0 CROSS JOIN agg"
    )


# ------------------------- space-time K surface (Diggle's D0) --

def _stk_params(
    radii_m: list, taus_us: list, cell_deg: float, lat_max: float
) -> tuple:
    """Validate both scale grids (positive, strictly ascending) and
    the bucket cover at (max radius, max tau). Returns (nx, radii,
    taus)."""
    rs = [float(r) for r in radii_m]
    ts = [int(t) for t in taus_us]
    if not rs or not ts:
        raise ValueError("radii_m and taus_us must be non-empty")
    if any(r <= 0 for r in rs) or any(
        b <= a for a, b in zip(rs, rs[1:])
    ):
        raise ValueError(
            f"radii_m must be positive and strictly ascending, "
            f"got {radii_m}"
        )
    if any(t <= 0 for t in ts) or any(
        b <= a for a, b in zip(ts, ts[1:])
    ):
        raise ValueError(
            f"taus_us must be positive and strictly ascending, "
            f"got {taus_us}"
        )
    nx, _ = _coloc_params(rs[-1], ts[-1], cell_deg, lat_max)
    return nx, rs, ts


def _stk_out_sql() -> tuple:
    """Shared projection over (n, pairs_space, pairs_time,
    pairs_both): the Knox-style expectation under space-time
    independence, the ratio, and Diggle's dimensionless interaction
    excess D0 = ratio − 1 (D̂(s,t)/(K̂_s·K̂_t) — positive where
    space-time interaction concentrates pairs beyond the marginals)."""
    p = "(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0E0) / 2.0E0)"
    ratio = (
        f"(CAST(pairs_both AS DOUBLE) * {p} "
        f"/ nullif(CAST(pairs_space AS DOUBLE) "
        f"* CAST(pairs_time AS DOUBLE), 0.0E0))"
    )
    return (
        f"round(CAST(pairs_space AS DOUBLE) "
        f"* CAST(pairs_time AS DOUBLE) / nullif({p}, 0.0E0), 6) "
        f"AS expected_both",
        f"round({ratio}, 6) AS ratio",
        f"round({ratio} - 1.0E0, 6) AS d0",
    )


def spacetime_k(
    df: DataFrame,
    radii_m: list,
    taus_us: list,
    cell_deg: float,
    lat_max: float,
    eid: str = "event_id",
    ts_us: str = "ts_us",
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Diggle's space-time K-function surface (Diggle, Chetwynd,
    Häggkvist & Morris 1995) — :func:`knox_test` swept over an
    (s, t) scale grid: for every spatial radius s and temporal radius
    t, the exact pair counts close in space / in time / in both, the
    independence expectation, the ratio, and the dimensionless
    interaction excess D0(s,t) = D̂/(K̂_s·K̂_t) = ratio − 1. The scale
    at which D0 peaks localizes the space-time interaction that a
    single-(δ,τ) Knox test can only detect.

    ONE spatial bucket join (3x3 cover at max(s), cover-validated)
    carries dt on every candidate row, so ALL (s, t) both-counts and
    all S(s) marginals are conditional sums in a single aggregation;
    ONE ±1-bucket temporal join (at max(t)) yields all T(t) marginals
    the same way. Every count is an exact BIGINT; pairs are found
    exactly once (the co-location offset-uniqueness argument).

    Output: one row per (s, t) — (s_m, tau_us, n_events, pairs_space,
    pairs_time, pairs_both, expected_both, ratio, d0)."""
    nx, rs, ts = _stk_params(radii_m, taus_us, cell_deg, lat_max)
    from .cluster import cell_id_sql
    from .crs import _pf

    T = ts[-1]
    _, cx, cy = cell_id_sql(cell_deg, lon, lat)
    pm = f"((({ts_us}) % {T} + {T}) % {T})"
    base = df.filter(F.expr(f"abs({lat}) <= {_pf(lat_max)}")).selectExpr(
        f"{eid} AS e", f"{ts_us} AS t", f"{lon} AS lo", f"{lat} AS la",
        f"{cx} AS cx", f"{cy} AS cy",
        f"CAST((({ts_us}) - {pm}) / {T} AS BIGINT) AS tb",
    )
    n_df = base.agg(F.count(F.lit(1)).cast("bigint").alias("n"))

    soffs = ", ".join(
        f"struct({dx} AS dx, {dy} AS dy)"
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)
    )
    sa = base.selectExpr(
        "e AS ea", "t AS ta", "lo AS loa", "la AS laa",
        "cx", "cy", f"explode(array({soffs})) AS o",
    ).selectExpr(
        "ea", "ta", "loa", "laa",
        f"((cx + o.dx + {nx}) % {nx}) AS jx", "(cy + o.dy) AS jy",
    )
    sb = base.selectExpr(
        "e AS eb", "t AS tc", "lo AS lob", "la AS lab",
        "cx AS jx", "cy AS jy",
    )
    hav = haversine_m_sql("loa", "laa", "lob", "lab")
    s_aggs = [
        F.expr(
            f"CAST(coalesce(sum(CASE WHEN d <= {_pf(r)} THEN 1 "
            f"ELSE 0 END), 0) AS BIGINT)"
        ).alias(f"s{i}")
        for i, r in enumerate(rs)
    ] + [
        F.expr(
            f"CAST(coalesce(sum(CASE WHEN d <= {_pf(r)} "
            f"AND adt <= {t} THEN 1 ELSE 0 END), 0) AS BIGINT)"
        ).alias(f"b{i}_{j}")
        for i, r in enumerate(rs) for j, t in enumerate(ts)
    ]
    sp = (
        sa.join(sb, ["jx", "jy"])
        .filter(F.expr(
            f"ea < eb AND round({hav}, {_ND}) <= {_pf(rs[-1])}"
        ))
        .selectExpr(
            f"round({hav}, {_ND}) AS d", "abs(tc - ta) AS adt",
        )
        .agg(*s_aggs)
    )
    ta_ = base.selectExpr(
        "e AS ea", "t AS ta", "explode(array(-1, 0, 1)) AS db", "tb",
    ).selectExpr("ea", "ta", "(tb + db) AS jb")
    tb_ = base.selectExpr("e AS eb", "t AS tc", "tb AS jb")
    t_aggs = [
        F.expr(
            f"CAST(coalesce(sum(CASE WHEN adt <= {t} THEN 1 "
            f"ELSE 0 END), 0) AS BIGINT)"
        ).alias(f"t{j}")
        for j, t in enumerate(ts)
    ]
    tp = (
        ta_.join(tb_, ["jb"])
        .filter(F.expr(f"ea < eb AND abs(tc - ta) <= {T}"))
        .selectExpr("abs(tc - ta) AS adt")
        .agg(*t_aggs)
    )
    stack = ", ".join(
        f"struct(CAST({_pf(r)} AS DOUBLE) AS s_m, "
        f"CAST({t} AS BIGINT) AS tau_us, s{i} AS pairs_space, "
        f"t{j} AS pairs_time, b{i}_{j} AS pairs_both)"
        for i, r in enumerate(rs) for j, t in enumerate(ts)
    )
    return (
        sp.crossJoin(F.broadcast(tp))
        .crossJoin(F.broadcast(n_df))
        .selectExpr(f"explode(array({stack})) AS g", "n")
        .selectExpr(
            "g.s_m AS s_m", "g.tau_us AS tau_us", "n AS n_events",
            "g.pairs_space AS pairs_space",
            "g.pairs_time AS pairs_time",
            "g.pairs_both AS pairs_both", "n",
        )
        .selectExpr(
            "s_m", "tau_us", "n_events", "pairs_space", "pairs_time",
            "pairs_both", *_stk_out_sql(),
        )
    )


def spacetime_k_sql(
    src_sql: str,
    radii_m: list,
    taus_us: list,
    cell_deg: float,
    lat_max: float,
    eid: str = "event_id",
    ts_us: str = "ts_us",
    lon: str = "lon",
    lat: str = "lat",
) -> str:
    """BRUTE-FORCE oracle twin of :func:`spacetime_k`: un-bucketed
    pair scans (spatial filtered to max radius WITH dt carried; the
    temporal side an IEJoin range join), conditional counts per grid
    point via VALUES tables — proving both covers complete. Quadratic
    by design (sf0.01-sized, like knox)."""
    nx, rs, ts = _stk_params(radii_m, taus_us, cell_deg, lat_max)
    from .crs import _pf

    T = ts[-1]
    hav = haversine_m_sql("a.lo", "a.la", "b.lo", "b.la")
    rvals = ", ".join(f"({_pf(r)})" for r in rs)
    tvals = ", ".join(f"({t})" for t in ts)
    return (
        f"WITH e AS (SELECT {eid} AS e, {ts_us} AS t, {lon} AS lo, "
        f"{lat} AS la FROM ({src_sql}) s "
        f"WHERE abs({lat}) <= {_pf(lat_max)}), "
        f"nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM e), "
        f"sp AS (SELECT round({hav}, {_ND}) AS d, "
        f"abs(b.t - a.t) AS adt FROM e a JOIN e b ON a.e < b.e "
        f"WHERE round({hav}, {_ND}) <= {_pf(rs[-1])}), "
        f"tp AS (SELECT abs(b.t - a.t) AS adt "
        f"FROM e a JOIN e b ON a.e < b.e "
        f"AND b.t BETWEEN a.t - {T} AND a.t + {T}), "
        f"rg(s_m) AS (SELECT CAST(v AS DOUBLE) "
        f"FROM (VALUES {rvals}) q(v)), "
        f"tg(tau_us) AS (SELECT CAST(v AS BIGINT) "
        f"FROM (VALUES {tvals}) q(v)), "
        f"sm AS (SELECT s_m, CAST(count(d) AS BIGINT) AS pairs_space "
        f"FROM rg LEFT JOIN sp ON d <= s_m GROUP BY s_m), "
        f"tm AS (SELECT tau_us, CAST(count(adt) AS BIGINT) "
        f"AS pairs_time FROM tg LEFT JOIN tp ON adt <= tau_us "
        f"GROUP BY tau_us), "
        f"bm AS (SELECT g.s_m, g.tau_us, "
        f"CAST(count(sp.d) AS BIGINT) AS pairs_both "
        f"FROM (SELECT s_m, tau_us FROM rg CROSS JOIN tg) g "
        f"LEFT JOIN sp ON sp.d <= g.s_m AND sp.adt <= g.tau_us "
        f"GROUP BY 1, 2) "
        f"SELECT bm.s_m, bm.tau_us, n AS n_events, "
        f"sm.pairs_space, tm.pairs_time, bm.pairs_both, "
        + ", ".join(_stk_out_sql())
        + " FROM bm JOIN sm ON bm.s_m = sm.s_m "
        f"JOIN tm ON bm.tau_us = tm.tau_us CROSS JOIN nn"
    )


# -------------------------- empirical semivariogram (geostatistics) --

_SVG_SCALE = 100  # value quantum: 1e-2 units (see headroom note below)


def _svg_params(bounds_m: list, cell_deg: float, lat_max: float) -> tuple:
    """Validate the lag-bin upper bounds (positive, strictly ascending)
    and the 3x3 bucket cover at max(bounds) — the ripley/knox complete-
    cover argument (:func:`_ripley_params`). Returns (nx, bounds)."""
    nx, rs, _ = _ripley_params(bounds_m, cell_deg, lat_max)
    return nx, rs


def _svg_out_sql() -> tuple:
    """Shared projection over (n_pairs, ssq, smm): the Matheron
    estimator gamma(h) = ssq / (2·N(h)·scale²) and the bin's mean pair
    distance (for plotting at the empirical bin centroid). Both are
    single double divisions of BIGINT-exact sums; NULL for empty bins."""
    np_ = "nullif(CAST(n_pairs AS DOUBLE), 0.0E0)"
    s2 = float(_SVG_SCALE * _SVG_SCALE)
    return (
        f"round(CAST(ssq AS DOUBLE) / (2.0E0 * {np_} * {s2!r}E0), 6) "
        f"AS gamma",
        f"round(CAST(smm AS DOUBLE) / 1000.0E0 / {np_}, 6) AS mean_d_m",
    )


def semivariogram(
    df: DataFrame,
    value: str,
    bounds_m: list,
    cell_deg: float,
    lat_max: float,
    eid: str = "event_id",
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Empirical (Matheron) semivariogram of a measured point field —
    the geostatistics primitive under kriging/IDW range selection
    (reference climate fields carry exactly this spatial-continuity
    structure; the repo's ``idw_regrid`` power/radius choices are what
    a variogram informs). Per half-open lag bin (lo, hi]:
    gamma(h) = 1/(2·N(h)) · sum_{d_ij in bin} (z_i − z_j)², over the
    |lat| <= lat_max band; bin 0 opens at 0 so exactly co-located pairs
    (d_mm = 0) are excluded (nugget estimation needs co-located
    duplicates handled upstream, documented).

    Exact and never a cross product: the ONE 3x3 bucket candidate join
    at cell width >= max(bounds) is validated complete
    (:func:`_ripley_params` — every qualifying pair found exactly
    once); values quantize to BIGINT at 1e-2 units BEFORE any
    arithmetic, so per-bin squared-difference sums are exact integers
    (order-independent, the sum(double) trap); distances accumulate as
    BIGINT millimeters (od_flows convention). ALL bins share the one
    join — per-bin (count, ssq, smm) are conditional sums inside a
    single aggregation, unpivoted by a bounded literal explode.

    Headroom: sum(dd) <= N(h)·(max|z_i−z_j|·100)²; at a 600-unit value
    spread that caps N(h) at ~2.5e9 pairs per bin before BIGINT
    overflow — lag-bounded pair counts sit far below that at any SF
    here; rescale _SVG_SCALE for wider-spread fields.

    Output: one row per bin (lo_m, hi_m, n_pairs, mean_d_m, gamma),
    floats round(.,6); NULL gamma/mean for empty bins. NULL values are
    excluded up front (they carry no measurement).
    """
    nx, rs = _svg_params(bounds_m, cell_deg, lat_max)
    from .cluster import cell_id_sql
    from .crs import _pf

    _, cx, cy = cell_id_sql(cell_deg, lon, lat)
    q = f"CAST(round(({value}) * {_SVG_SCALE}.0E0, 0) AS BIGINT)"
    base = df.filter(F.expr(
        f"abs({lat}) <= {_pf(lat_max)} AND ({value}) IS NOT NULL"
    )).selectExpr(
        f"{eid} AS e", f"{lon} AS lo", f"{lat} AS la", f"{q} AS qv",
        f"{cx} AS cx", f"{cy} AS cy",
    )
    soffs = ", ".join(
        f"struct({dx} AS dx, {dy} AS dy)"
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)
    )
    a = base.selectExpr(
        "e AS ea", "lo AS loa", "la AS laa", "qv AS qa",
        "cx", "cy", f"explode(array({soffs})) AS o",
    ).selectExpr(
        "ea", "loa", "laa", "qa",
        f"((cx + o.dx + {nx}) % {nx}) AS jx", "(cy + o.dy) AS jy",
    )
    b = base.selectExpr(
        "e AS eb", "lo AS lob", "la AS lab", "qv AS qb",
        "cx AS jx", "cy AS jy",
    )
    hav = haversine_m_sql("loa", "laa", "lob", "lab")
    mm = f"CAST(round({hav} * 1000.0E0) AS BIGINT)"
    lo_mm = 0
    conds = []
    for i, r in enumerate(rs):
        hi_mm = int(round(r * 1000))
        c = f"(d_mm > {lo_mm} AND d_mm <= {hi_mm})"
        conds.append((i, c))
        lo_mm = hi_mm
    sums = (
        a.join(b, ["jx", "jy"])
        .filter(F.expr(
            f"ea < eb AND {mm} <= {int(round(rs[-1] * 1000))}"
        ))
        .selectExpr(
            f"{mm} AS d_mm",
            "(qa - qb) * (qa - qb) AS dd",
        )
        .agg(*[
            F.expr(e).alias(n)
            for i, c in conds
            for e, n in (
                (f"CAST(coalesce(sum(CASE WHEN {c} THEN 1 ELSE 0 END), "
                 f"0) AS BIGINT)", f"n{i}"),
                (f"CAST(coalesce(sum(CASE WHEN {c} THEN dd END), 0) "
                 f"AS BIGINT)", f"s{i}"),
                (f"CAST(coalesce(sum(CASE WHEN {c} THEN d_mm END), 0) "
                 f"AS BIGINT)", f"m{i}"),
            )
        ])
    )
    lo = 0.0
    stk = []
    for i, r in enumerate(rs):
        stk.append(
            f"struct(CAST({_pf(lo)} AS DOUBLE) AS lo_m, "
            f"CAST({_pf(r)} AS DOUBLE) AS hi_m, "
            f"n{i} AS n_pairs, s{i} AS ssq, m{i} AS smm)"
        )
        lo = r
    return (
        sums.selectExpr(f"explode(array({', '.join(stk)})) AS s")
        .selectExpr(
            "s.lo_m AS lo_m", "s.hi_m AS hi_m", "s.n_pairs AS n_pairs",
            "s.ssq AS ssq", "s.smm AS smm",
        )
        .selectExpr("lo_m", "hi_m", "n_pairs", *_svg_out_sql())
    )


def semivariogram_sql(
    src_sql: str,
    value: str,
    bounds_m: list,
    cell_deg: float,
    lat_max: float,
    eid: str = "event_id",
    lon: str = "lon",
    lat: str = "lat",
) -> str:
    """BRUTE-FORCE oracle twin of :func:`semivariogram`: the full
    un-bucketed pair scan (max-bound filter inside the pair CTE),
    per-bin sums via a VALUES bin table LEFT-joined on the half-open
    interval — independently proving the engine's bucket cover
    complete. Quadratic by design: sf0.01-sized, like knox/ripley."""
    _, rs = _svg_params(bounds_m, cell_deg, lat_max)
    from .crs import _pf

    q = f"CAST(round(({value}) * {_SVG_SCALE}.0E0, 0) AS BIGINT)"
    hav = haversine_m_sql("a.lo", "a.la", "b.lo", "b.la")
    mm = f"CAST(round({hav} * 1000.0E0) AS BIGINT)"
    lo = 0.0
    vals = []
    for r in rs:
        vals.append(
            f"(CAST({_pf(lo)} AS DOUBLE), CAST({_pf(r)} AS DOUBLE), "
            f"{0}, {int(round(lo * 1000))}, {int(round(r * 1000))})"
        )
        lo = r
    # bins(lo_m, hi_m, _z, lo_mm, hi_mm); _z keeps VALUES width stable
    return (
        f"WITH e AS (SELECT {eid} AS e, {lon} AS lo, {lat} AS la, "
        f"{q} AS qv FROM ({src_sql}) s "
        f"WHERE abs({lat}) <= {_pf(lat_max)} "
        f"AND ({value}) IS NOT NULL), "
        f"pr AS (SELECT {mm} AS d_mm, "
        f"(a.qv - b.qv) * (a.qv - b.qv) AS dd "
        f"FROM e a JOIN e b ON a.e < b.e "
        f"WHERE {mm} <= {int(round(rs[-1] * 1000))}), "
        f"bins(lo_m, hi_m, _z, lo_mm, hi_mm) AS "
        f"(VALUES {', '.join(vals)}), "
        f"agg AS (SELECT lo_m, hi_m, "
        f"CAST(count(d_mm) AS BIGINT) AS n_pairs, "
        f"CAST(coalesce(sum(dd), 0) AS BIGINT) AS ssq, "
        f"CAST(coalesce(sum(d_mm), 0) AS BIGINT) AS smm "
        f"FROM bins LEFT JOIN pr "
        f"ON d_mm > lo_mm AND d_mm <= hi_mm "
        f"GROUP BY lo_m, hi_m) "
        f"SELECT lo_m, hi_m, n_pairs, "
        + ", ".join(_svg_out_sql())
        + " FROM agg"
    )


# ------------------------- variogram model fit (WLS) --


def _vfit_params(bounds_m: list, ranges_m: list, model: str) -> list:
    if model not in ("exponential", "spherical"):
        raise ValueError(
            f"model must be 'exponential' | 'spherical', got {model!r}"
        )
    if len(bounds_m) < 3:
        raise ValueError(
            f"need >= 3 lag bins to fit nugget+sill+range, got "
            f"{len(bounds_m)}"
        )
    rs = [float(a) for a in ranges_m]
    if not 2 <= len(rs) <= 24:
        raise ValueError(
            f"ranges_m must hold 2..24 candidates (bounded literal "
            f"fan-out), got {len(ranges_m)}"
        )
    if any(a <= 0 for a in rs) or any(
        b <= a for a, b in zip(rs, rs[1:])
    ):
        raise ValueError(
            f"ranges_m must be positive strictly ascending, got "
            f"{ranges_m}"
        )
    return rs


def _vfit_basis(h: str, a: float, model: str) -> str:
    """Model basis f(h; a) in [0, 1] — exp/division only (spherical's
    h >= a class edge is the measure-zero boundary precedent)."""
    from .crs import _pf

    al = _pf(a)
    r = f"(({h}) / {al})"
    if model == "exponential":
        return f"(1.0E0 - exp(-3.0E0 * ({h}) / {al}))"
    return (
        f"(CASE WHEN ({h}) >= {al} THEN 1.0E0 "
        f"ELSE 1.5E0 * {r} - 0.5E0 * {r} * {r} * {r} END)"
    )


def _vfit_stage_sqls(bounds_m: list, ranges: list, model: str,
                     by: tuple = ()):
    """(pivot_exprs, moment_exprs, out_exprs) — shared verbatim by the
    DataFrame and oracle paths, so parity is by construction.

    Stage 1 pivots the (always-complete) semivariogram bin table back
    to ONE row keyed on the compile-time lo_m literals (fixed literal
    summation order — no engine-order-dependent double sums anywhere).
    Stage 2 computes the global moments and, per candidate range a,
    the weighted basis moments. Stage 3 solves each candidate's
    nonnegativity-constrained 2-var WLS exactly, and stage 4 picks
    the global best via least() over the candidate sse columns + a
    first-match CASE (ranges ascend, so sse ties break toward the
    shortest range — plain double comparisons, dialect-shared)."""
    from .crs import _pf

    K = len(bounds_m)
    lows = [0.0] + [float(b) for b in bounds_m[:-1]]
    pivot = []
    for i, lo in enumerate(lows):
        c = f"lo_m = {_pf(lo)}"
        pivot += [
            f"CAST(coalesce(sum(CASE WHEN {c} AND n_pairs > 0 "
            f"THEN n_pairs END), 0) AS BIGINT) AS w{i}",
            f"max(CASE WHEN {c} THEN gamma END) AS g{i}",
            f"max(CASE WHEN {c} THEN mean_d_m END) AS h{i}",
        ]

    def wsum(term) -> str:
        return "(" + " + ".join(
            f"(CASE WHEN w{i} > 0 THEN CAST(w{i} AS DOUBLE) "
            f"* ({term(i)}) ELSE 0.0E0 END)"
            for i in range(K)
        ) + ")"

    moments = [*by,
        "(" + " + ".join(
            f"(CASE WHEN w{i} > 0 THEN 1 ELSE 0 END)" for i in range(K)
        ) + ") AS nb",
        wsum(lambda i: "1.0E0") + " AS sw",
        wsum(lambda i: f"g{i}") + " AS swg",
        wsum(lambda i: f"g{i} * g{i}") + " AS swgg",
    ]
    for k, a in enumerate(ranges):
        f = lambda i, a=a: _vfit_basis(f"h{i}", a, model)
        moments += [
            wsum(lambda i, f=f: f(i)) + f" AS swf{k}",
            wsum(lambda i, f=f: f"{f(i)} * {f(i)}") + f" AS swff{k}",
            wsum(lambda i, f=f: f"g{i} * {f(i)}") + f" AS swfg{k}",
        ]

    # Per candidate: the exact nonneg-constrained 2-var WLS. The
    # constrained optimum is the unconstrained stationary point when
    # feasible, else one of the two (clamped) axis solutions — all
    # three evaluated, picked by least() + first-match CASE (plain
    # double comparisons, dialect-shared; infeasible -> 1e308
    # sentinel; within-candidate ties prefer u then the c0=0 axis).
    cand = [*by, "nb", "sw", "swg", "swgg"]
    for k, a in enumerate(ranges):
        swf, swff, swfg = f"swf{k}", f"swff{k}", f"swfg{k}"
        den = f"(sw * {swff} - {swf} * {swf})"
        c1u = f"((sw * {swfg} - {swf} * swg) / {den})"
        c0u = f"((swg - {c1u} * {swf}) / sw)"

        def sse(c0: str, c1: str) -> str:
            return (
                f"(swgg - 2.0E0 * {c0} * swg - 2.0E0 * {c1} * {swfg} "
                f"+ {c0} * {c0} * sw "
                f"+ 2.0E0 * {c0} * {c1} * {swf} "
                f"+ {c1} * {c1} * {swff})"
            )

        c1a = (
            f"coalesce(greatest(0.0E0, {swfg} "
            f"/ nullif({swff}, 0.0E0)), 0.0E0)"
        )
        c0b = "greatest(0.0E0, swg / sw)"
        feas = f"({den} > 0.0E0 AND {c0u} >= 0.0E0 AND {c1u} >= 0.0E0)"
        su = f"(CASE WHEN {feas} THEN {sse(c0u, c1u)} ELSE 1.0E308 END)"
        sa = sse("0.0E0", c1a)
        sb = sse(c0b, "0.0E0")
        bk = f"least({su}, {sa}, {sb})"
        cand += [
            f"{bk} AS sse{k}",
            f"(CASE WHEN {su} = {bk} THEN {c0u} "
            f"WHEN {sa} = {bk} THEN 0.0E0 ELSE {c0b} END) AS c0_{k}",
            f"(CASE WHEN {su} = {bk} THEN {c1u} "
            f"WHEN {sa} = {bk} THEN {c1a} ELSE 0.0E0 END) AS c1_{k}",
        ]

    # Global argmin: least() over the candidate sse columns, then the
    # FIRST candidate attaining it (ranges ascend, so sse ties break
    # toward the shortest range — a deterministic total order).
    bsse = "least(" + ", ".join(f"sse{k}" for k in range(len(ranges))) + ")"

    def pick(field) -> str:
        arms = " ".join(
            f"WHEN sse{k} = {bsse} THEN {field(k)}"
            for k in range(len(ranges))
        )
        return f"(CASE {arms} END)"

    g = lambda e: f"(CASE WHEN nb >= 3 THEN {e} END)"
    b_c1 = pick(lambda k: f"c1_{k}")
    outs = [*by,
        f"'{model}' AS model",
        "CAST(nb AS BIGINT) AS n_bins_used",
        g(
            f"CASE WHEN {b_c1} > 0.0E0 THEN "
            + pick(lambda k: f"round({_pf(float(ranges[k]))}, 6)")
            + " END"
        )
        + " AS range_m",
        g("round(" + pick(lambda k: f"c0_{k}") + ", 6)") + " AS nugget",
        g(f"round({b_c1}, 6)") + " AS psill",
        g(
            "round(" + pick(lambda k: f"c0_{k} + c1_{k}") + ", 6)"
        )
        + " AS sill",
        g(f"round({bsse}, 6)") + " AS wsse",
    ]
    return pivot, moments, cand, outs


def variogram_fit(
    gdf: DataFrame,
    bounds_m: list,
    ranges_m: list,
    model: str = "exponential",
    by: tuple = (),
) -> DataFrame:
    """Fit a bounded variogram MODEL gamma(h) = c0 + c1·f(h; a) to an
    empirical semivariogram (:func:`semivariogram` output) by weighted
    least squares (weights N(h), Cressie's pragmatic choice) over a
    caller-given candidate-range grid — the step that turns the
    empirical cloud into the (nugget, sill, range) triple every
    kriging/IDW radius decision reads (Goovaerts §4.4; exponential
    f = 1 − e^{−3h/a} and spherical with PRACTICAL range a, the GSLIB
    convention).

    For a FIXED range the model is linear in (c0, c1), so each
    candidate solves in closed form; the nonnegativity constraint
    (nugget, partial sill >= 0) is exact: the unconstrained stationary
    point when feasible, else the better axis solution — all ranked
    per candidate, then globally, by the (sse, a) total order.
    Everything evaluates on the ONE pivoted row in fixed literal
    order (no engine-order-dependent double sums); empty bins carry
    zero weight; < 3 non-empty bins -> NULL fit (n_bins_used kept);
    a flat fit (c1 = 0) has no range -> NULL range_m.

    Output: one row (model, n_bins_used, range_m, nugget, psill,
    sill, wsse), floats round(.,6)."""
    rs = _vfit_params(bounds_m, ranges_m, model)
    by = tuple(by)
    pivot, moments, cand, outs = _vfit_stage_sqls(
        bounds_m, rs, model, by
    )
    src = gdf.selectExpr(*by, "lo_m", "n_pairs", "gamma", "mean_d_m")
    if by:
        one = src.groupBy(*by).agg(*[F.expr(e) for e in pivot])
    else:
        one = src.agg(*[F.expr(e) for e in pivot])
    return one.selectExpr(*moments).selectExpr(*cand).selectExpr(*outs)


def variogram_fit_sql(
    gamma_sql: str,
    bounds_m: list,
    ranges_m: list,
    model: str = "exponential",
    by: tuple = (),
) -> str:
    """Oracle twin of :func:`variogram_fit` — the same three shared
    stage strings over the semivariogram oracle as a CTE."""
    rs = _vfit_params(bounds_m, ranges_m, model)
    by = tuple(by)
    pivot, moments, cand, outs = _vfit_stage_sqls(
        bounds_m, rs, model, by
    )
    grp = (" GROUP BY " + ", ".join(by)) if by else ""
    sel_by = "".join(f"{c}, " for c in by)
    return (
        f"WITH emp AS ({gamma_sql}), "
        f"one AS (SELECT {sel_by}{', '.join(pivot)} FROM emp{grp}), "
        f"mom AS (SELECT {', '.join(moments)} FROM one), "
        f"cnd AS (SELECT {', '.join(cand)} FROM mom) "
        f"SELECT {', '.join(outs)} FROM cnd"
    )


# ---------------- directional semivariogram (anisotropy) --

_SVG_SECTORS = ("NS", "NE", "EW", "SE")


def _svg_sector_sql(dlon: str, dlat: str, midlat: str) -> str:
    """Directional sector (0 NS / 1 NE / 2 EW / 3 SE) of an unordered
    pair from its local planar azimuth atan2(Δx, Δy) with
    Δx = wrapped Δlon·cos(mid lat): direction is mod 180° (pairs are
    unordered) in four 45° classes centered on the axes. One SHARED
    trig string — atan2/cos are the libm precedent, and a flip needs
    the azimuth to land EXACTLY on a 22.5° class edge."""
    wd = (
        f"((({dlon}) + 180.0E0) - 360.0E0 "
        f"* floor((({dlon}) + 180.0E0) / 360.0E0) - 180.0E0)"
    )
    az = (
        f"degrees(atan2({wd} * cos(radians({midlat})), ({dlat})))"
    )
    azm = f"((({az}) % 180.0E0 + 180.0E0) % 180.0E0)"
    return (
        f"CAST(floor((({azm}) + 22.5E0) / 45.0E0) AS BIGINT) % 4"
    )


def _svg_dir_prep(bounds_m: list, cell_deg: float, lat_max: float):
    """(nx, bounds, per-(sector,bin) condition list, output structs)."""
    nx, rs = _svg_params(bounds_m, cell_deg, lat_max)
    conds = []
    lo_mm = 0
    for i, r in enumerate(rs):
        hi_mm = int(round(r * 1000))
        for sct in range(4):
            conds.append(
                (sct, i,
                 f"(sector = {sct} AND d_mm > {lo_mm} "
                 f"AND d_mm <= {hi_mm})")
            )
        lo_mm = hi_mm
    return nx, rs, conds


def semivariogram_directional(
    df: DataFrame,
    value: str,
    bounds_m: list,
    cell_deg: float,
    lat_max: float,
    eid: str = "event_id",
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Directional (anisotropic) semivariogram — :func:`semivariogram`
    split into the four standard 45° azimuth classes (N-S / NE-SW /
    E-W / SE-NW, the textbook anisotropy diagnostic: geology and
    climate fields routinely carry direction-dependent ranges, and an
    omnidirectional variogram silently averages them away; cf.
    Goovaerts 1997 §4.3). Same exact machinery: the ONE bucketed
    candidate join serves all (sector, lag) classes via conditional
    sums; 1e-2-quantized BIGINT squared-difference moments; the
    sector comes from the shared local-planar azimuth
    (:func:`_svg_sector_sql`).

    Output: one row per (sector, lag bin): (sector, lo_m, hi_m,
    n_pairs, gamma, mean_d_m); sector ∈ {'NS','NE','EW','SE'}."""
    nx, rs, conds = _svg_dir_prep(bounds_m, cell_deg, lat_max)
    from .cluster import cell_id_sql
    from .crs import _pf

    _, cx, cy = cell_id_sql(cell_deg, lon, lat)
    q = f"CAST(round(({value}) * {_SVG_SCALE}.0E0, 0) AS BIGINT)"
    base = df.filter(F.expr(
        f"abs({lat}) <= {_pf(lat_max)} AND ({value}) IS NOT NULL"
    )).selectExpr(
        f"{eid} AS e", f"{lon} AS lo", f"{lat} AS la", f"{q} AS qv",
        f"{cx} AS cx", f"{cy} AS cy",
    )
    soffs = ", ".join(
        f"struct({dx} AS dx, {dy} AS dy)"
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)
    )
    a = base.selectExpr(
        "e AS ea", "lo AS loa", "la AS laa", "qv AS qa",
        "cx", "cy", f"explode(array({soffs})) AS o",
    ).selectExpr(
        "ea", "loa", "laa", "qa",
        f"((cx + o.dx + {nx}) % {nx}) AS jx", "(cy + o.dy) AS jy",
    )
    b = base.selectExpr(
        "e AS eb", "lo AS lob", "la AS lab", "qv AS qb",
        "cx AS jx", "cy AS jy",
    )
    hav = haversine_m_sql("loa", "laa", "lob", "lab")
    mm = f"CAST(round({hav} * 1000.0E0) AS BIGINT)"
    sector = _svg_sector_sql(
        "lob - loa", "lab - laa", "(laa + lab) / 2.0E0"
    )
    sums = (
        a.join(b, ["jx", "jy"])
        .filter(F.expr(
            f"ea < eb AND {mm} <= {int(round(rs[-1] * 1000))}"
        ))
        .selectExpr(
            f"{mm} AS d_mm",
            "(qa - qb) * (qa - qb) AS dd",
            f"{sector} AS sector",
        )
        .agg(*[
            F.expr(e).alias(nme)
            for sct, i, c in conds
            for e, nme in (
                (f"CAST(coalesce(sum(CASE WHEN {c} THEN 1 ELSE 0 "
                 f"END), 0) AS BIGINT)", f"n{sct}_{i}"),
                (f"CAST(coalesce(sum(CASE WHEN {c} THEN dd END), 0) "
                 f"AS BIGINT)", f"s{sct}_{i}"),
                (f"CAST(coalesce(sum(CASE WHEN {c} THEN d_mm END), "
                 f"0) AS BIGINT)", f"m{sct}_{i}"),
            )
        ])
    )
    stk = []
    for sct in range(4):
        lo = 0.0
        for i, r in enumerate(rs):
            stk.append(
                f"struct('{_SVG_SECTORS[sct]}' AS sector, "
                f"CAST({_pf(lo)} AS DOUBLE) AS lo_m, "
                f"CAST({_pf(r)} AS DOUBLE) AS hi_m, "
                f"n{sct}_{i} AS n_pairs, s{sct}_{i} AS ssq, "
                f"m{sct}_{i} AS smm)"
            )
            lo = r
    return (
        sums.selectExpr(f"explode(array({', '.join(stk)})) AS s")
        .selectExpr(
            "s.sector AS sector", "s.lo_m AS lo_m", "s.hi_m AS hi_m",
            "s.n_pairs AS n_pairs", "s.ssq AS ssq", "s.smm AS smm",
        )
        .selectExpr("sector", "lo_m", "hi_m", "n_pairs",
                    *_svg_out_sql())
    )


def semivariogram_directional_sql(
    src_sql: str,
    value: str,
    bounds_m: list,
    cell_deg: float,
    lat_max: float,
    eid: str = "event_id",
    lon: str = "lon",
    lat: str = "lat",
) -> str:
    """BRUTE-FORCE oracle twin of :func:`semivariogram_directional`:
    the full un-bucketed pair scan with the same shared sector
    expression, per-class sums via a VALUES (sector × bin) table —
    quadratic by design, sf0.01-sized."""
    nx, rs, _ = _svg_dir_prep(bounds_m, cell_deg, lat_max)
    from .crs import _pf

    q = f"CAST(round(({value}) * {_SVG_SCALE}.0E0, 0) AS BIGINT)"
    hav = haversine_m_sql("a.lo", "a.la", "b.lo", "b.la")
    mm = f"CAST(round({hav} * 1000.0E0) AS BIGINT)"
    sector = _svg_sector_sql(
        "b.lo - a.lo", "b.la - a.la", "(a.la + b.la) / 2.0E0"
    )
    vals = []
    for sct in range(4):
        lo = 0.0
        for r in rs:
            vals.append(
                f"({sct}, '{_SVG_SECTORS[sct]}', "
                f"CAST({_pf(lo)} AS DOUBLE), "
                f"CAST({_pf(r)} AS DOUBLE), "
                f"{int(round(lo * 1000))}, {int(round(r * 1000))})"
            )
            lo = r
    return (
        f"WITH e AS (SELECT {eid} AS e, {lon} AS lo, {lat} AS la, "
        f"{q} AS qv FROM ({src_sql}) s "
        f"WHERE abs({lat}) <= {_pf(lat_max)} "
        f"AND ({value}) IS NOT NULL), "
        f"pr AS (SELECT {mm} AS d_mm, "
        f"(a.qv - b.qv) * (a.qv - b.qv) AS dd, "
        f"{sector} AS sct "
        f"FROM e a JOIN e b ON a.e < b.e "
        f"WHERE {mm} <= {int(round(rs[-1] * 1000))}), "
        f"bins(si, sector, lo_m, hi_m, lo_mm, hi_mm) AS "
        f"(VALUES {', '.join(vals)}), "
        f"agg AS (SELECT sector, lo_m, hi_m, "
        f"CAST(count(d_mm) AS BIGINT) AS n_pairs, "
        f"CAST(coalesce(sum(dd), 0) AS BIGINT) AS ssq, "
        f"CAST(coalesce(sum(d_mm), 0) AS BIGINT) AS smm "
        f"FROM bins LEFT JOIN pr "
        f"ON sct = si AND d_mm > lo_mm AND d_mm <= hi_mm "
        f"GROUP BY sector, lo_m, hi_m) "
        f"SELECT sector, lo_m, hi_m, n_pairs, "
        + ", ".join(_svg_out_sql())
        + " FROM agg"
    )


# ------------------- space-time semivariogram --


def _svg_st_prep(
    bounds_m: list, t_bounds_us: list, cell_deg: float, lat_max: float
):
    """(nx, bounds, t_bounds, per-(space,time)-class conditions)."""
    nx, rs = _svg_params(bounds_m, cell_deg, lat_max)
    ts = [int(t) for t in t_bounds_us]
    if not 1 <= len(ts) <= 8:
        raise ValueError(
            f"t_bounds_us must hold 1..8 time-lag bins (bounded "
            f"literal fan-out), got {len(t_bounds_us)}"
        )
    if any(t <= 0 for t in ts) or any(
        b <= a for a, b in zip(ts, ts[1:])
    ):
        raise ValueError(
            f"t_bounds_us must be positive strictly ascending, got "
            f"{t_bounds_us}"
        )
    if len(rs) * len(ts) > 48:
        raise ValueError(
            f"space x time classes capped at 48 conditional-sum "
            f"triples, got {len(rs) * len(ts)}"
        )
    conds = []
    lo_mm = 0
    for i, r in enumerate(rs):
        hi_mm = int(round(r * 1000))
        t_lo = -1  # time bin 0 is CLOSED at 0: simultaneous pairs count
        for j, t in enumerate(ts):
            conds.append(
                (i, j,
                 f"(d_mm > {lo_mm} AND d_mm <= {hi_mm} "
                 f"AND dt_us > {t_lo} AND dt_us <= {t})")
            )
            t_lo = t
        lo_mm = hi_mm
    return nx, rs, ts, conds


def semivariogram_st(
    df: DataFrame,
    value: str,
    bounds_m: list,
    t_bounds_us: list,
    cell_deg: float,
    lat_max: float,
    eid: str = "event_id",
    ts_us: str = "ts_us",
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Space-time empirical semivariogram gamma(hs, ht) — the
    :func:`semivariogram` extended to a (spatial lag x temporal lag)
    SURFACE, the first object every spatio-temporal kriging /
    separability check reads (Cressie-Wikle 2011 §6.1; a purely
    spatial variogram silently pools all time lags, hiding temporal
    decorrelation). Per class (lo, hi] x (t_lo, t_hi]:
    gamma = ssq/(2·N) over pairs in BOTH windows; the time-lag bin 0
    is CLOSED at 0 (simultaneous pairs are the ht = 0 column; exactly
    co-located pairs stay excluded via the open spatial bin 0, as in
    the spatial variogram).

    Same exact machinery: ONE 3x3 bucketed candidate join at cell
    width >= max(bounds) serves ALL (space x time) classes via
    conditional sums (unpivoted by a bounded literal explode);
    1e-2-quantized BIGINT value moments; |dt| as exact integer
    micros. Pairs beyond the last time bound ride the join but
    contribute to no class.

    Output: one row per class (lo_m, hi_m, lo_us, hi_us, n_pairs,
    gamma, mean_d_m), floats round(.,6)."""
    nx, rs, ts, conds = _svg_st_prep(
        bounds_m, t_bounds_us, cell_deg, lat_max
    )
    from .cluster import cell_id_sql
    from .crs import _pf

    _, cx, cy = cell_id_sql(cell_deg, lon, lat)
    q = f"CAST(round(({value}) * {_SVG_SCALE}.0E0, 0) AS BIGINT)"
    base = df.filter(F.expr(
        f"abs({lat}) <= {_pf(lat_max)} AND ({value}) IS NOT NULL"
    )).selectExpr(
        f"{eid} AS e", f"{lon} AS lo", f"{lat} AS la", f"{q} AS qv",
        f"CAST({ts_us} AS BIGINT) AS t",
        f"{cx} AS cx", f"{cy} AS cy",
    )
    soffs = ", ".join(
        f"struct({dx} AS dx, {dy} AS dy)"
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)
    )
    a = base.selectExpr(
        "e AS ea", "lo AS loa", "la AS laa", "qv AS qa", "t AS ta",
        "cx", "cy", f"explode(array({soffs})) AS o",
    ).selectExpr(
        "ea", "loa", "laa", "qa", "ta",
        f"((cx + o.dx + {nx}) % {nx}) AS jx", "(cy + o.dy) AS jy",
    )
    b = base.selectExpr(
        "e AS eb", "lo AS lob", "la AS lab", "qv AS qb", "t AS tb",
        "cx AS jx", "cy AS jy",
    )
    hav = haversine_m_sql("loa", "laa", "lob", "lab")
    mm = f"CAST(round({hav} * 1000.0E0) AS BIGINT)"
    sums = (
        a.join(b, ["jx", "jy"])
        .filter(F.expr(
            f"ea < eb AND {mm} <= {int(round(rs[-1] * 1000))}"
        ))
        .selectExpr(
            f"{mm} AS d_mm",
            "abs(ta - tb) AS dt_us",
            "(qa - qb) * (qa - qb) AS dd",
        )
        .agg(*[
            F.expr(e).alias(nme)
            for i, j, c in conds
            for e, nme in (
                (f"CAST(coalesce(sum(CASE WHEN {c} THEN 1 ELSE 0 "
                 f"END), 0) AS BIGINT)", f"n{i}_{j}"),
                (f"CAST(coalesce(sum(CASE WHEN {c} THEN dd END), 0) "
                 f"AS BIGINT)", f"s{i}_{j}"),
                (f"CAST(coalesce(sum(CASE WHEN {c} THEN d_mm END), "
                 f"0) AS BIGINT)", f"m{i}_{j}"),
            )
        ])
    )
    stk = []
    lo = 0.0
    for i, r in enumerate(rs):
        t_lo = 0
        for j, t in enumerate(ts):
            stk.append(
                f"struct(CAST({_pf(lo)} AS DOUBLE) AS lo_m, "
                f"CAST({_pf(r)} AS DOUBLE) AS hi_m, "
                f"CAST({t_lo} AS BIGINT) AS lo_us, "
                f"CAST({t} AS BIGINT) AS hi_us, "
                f"n{i}_{j} AS n_pairs, s{i}_{j} AS ssq, "
                f"m{i}_{j} AS smm)"
            )
            t_lo = t
        lo = r
    return (
        sums.selectExpr(f"explode(array({', '.join(stk)})) AS s")
        .selectExpr(
            "s.lo_m AS lo_m", "s.hi_m AS hi_m",
            "s.lo_us AS lo_us", "s.hi_us AS hi_us",
            "s.n_pairs AS n_pairs", "s.ssq AS ssq", "s.smm AS smm",
        )
        .selectExpr("lo_m", "hi_m", "lo_us", "hi_us", "n_pairs",
                    *_svg_out_sql())
    )


def semivariogram_st_sql(
    src_sql: str,
    value: str,
    bounds_m: list,
    t_bounds_us: list,
    cell_deg: float,
    lat_max: float,
    eid: str = "event_id",
    ts_us: str = "ts_us",
    lon: str = "lon",
    lat: str = "lat",
) -> str:
    """BRUTE-FORCE oracle twin of :func:`semivariogram_st`: full
    un-bucketed pair scan, per-class sums via a VALUES
    (space x time) table LEFT-joined on both half-open windows —
    quadratic by design, sf0.01-sized (the knox/ripley class)."""
    nx, rs, ts, _ = _svg_st_prep(
        bounds_m, t_bounds_us, cell_deg, lat_max
    )
    from .crs import _pf

    q = f"CAST(round(({value}) * {_SVG_SCALE}.0E0, 0) AS BIGINT)"
    hav = haversine_m_sql("a.lo", "a.la", "b.lo", "b.la")
    mm = f"CAST(round({hav} * 1000.0E0) AS BIGINT)"
    vals = []
    lo = 0.0
    for i, r in enumerate(rs):
        t_lo = -1
        t_show = 0
        for j, t in enumerate(ts):
            vals.append(
                f"(CAST({_pf(lo)} AS DOUBLE), CAST({_pf(r)} AS DOUBLE), "
                f"CAST({t_show} AS BIGINT), CAST({t} AS BIGINT), "
                f"{int(round(lo * 1000))}, {int(round(r * 1000))}, "
                f"{t_lo}, {t})"
            )
            t_lo = t
            t_show = t
        lo = r
    return (
        f"WITH e AS (SELECT {eid} AS e, {lon} AS lo, {lat} AS la, "
        f"{q} AS qv, CAST({ts_us} AS BIGINT) AS t FROM ({src_sql}) s "
        f"WHERE abs({lat}) <= {_pf(lat_max)} "
        f"AND ({value}) IS NOT NULL), "
        f"pr AS (SELECT {mm} AS d_mm, abs(a.t - b.t) AS dt_us, "
        f"(a.qv - b.qv) * (a.qv - b.qv) AS dd "
        f"FROM e a JOIN e b ON a.e < b.e "
        f"WHERE {mm} <= {int(round(rs[-1] * 1000))}), "
        f"bins(lo_m, hi_m, lo_us, hi_us, lo_mm, hi_mm, tl, th) AS "
        f"(VALUES {', '.join(vals)}), "
        f"agg AS (SELECT lo_m, hi_m, lo_us, hi_us, "
        f"CAST(count(d_mm) AS BIGINT) AS n_pairs, "
        f"CAST(coalesce(sum(dd), 0) AS BIGINT) AS ssq, "
        f"CAST(coalesce(sum(d_mm), 0) AS BIGINT) AS smm "
        f"FROM bins LEFT JOIN pr "
        f"ON d_mm > lo_mm AND d_mm <= hi_mm "
        f"AND dt_us > tl AND dt_us <= th "
        f"GROUP BY lo_m, hi_m, lo_us, hi_us) "
        f"SELECT lo_m, hi_m, lo_us, hi_us, n_pairs, "
        + ", ".join(_svg_out_sql())
        + " FROM agg"
    )


# ------------------- F-madogram (extremal dependence) --


def _fmado_out_sql() -> tuple:
    """Shared projection over (n_pairs, sdr = sum |2-midrank diffs|,
    smm, n = band point count): nu_F = sdr/(4·N(h)·n) (F = midrank/n,
    the 2x factors cancel into the 4), extremal coefficient
    theta(h) = (1 + 2nu)/(1 − 2nu) ∈ [1, 2] (1 = complete extremal
    dependence, 2 = asymptotic independence). Every moment is an
    exact BIGINT; nu ≤ 1/6 for a continuous field keeps the theta
    denominator away from 0 (nullif guards the degenerate all-tied
    case, where nu = 0 and theta = 1 exactly anyway)."""
    np_ = "nullif(CAST(n_pairs AS DOUBLE), 0.0E0)"
    nu = (
        f"(CAST(sdr AS DOUBLE) / (4.0E0 * {np_} * CAST(n AS DOUBLE)))"
    )
    return (
        f"round({nu}, 6) AS fmadogram",
        f"round((1.0E0 + 2.0E0 * {nu}) "
        f"/ nullif(1.0E0 - 2.0E0 * {nu}, 0.0E0), 6) AS ext_coef",
        f"round(CAST(smm AS DOUBLE) / 1000.0E0 / {np_}, 6) AS mean_d_m",
    )


def fmadogram(
    df: DataFrame,
    value: str,
    bounds_m: list,
    cell_deg: float,
    lat_max: float,
    eid: str = "event_id",
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """F-madogram nu_F(h) = ½·E|F(z_i) − F(z_j)| and the extremal
    coefficient theta(h) = (1 + 2nu)/(1 − 2nu) — the EXTREMES
    companion to :func:`semivariogram` (Cooley-Naveau-Poncet 2006):
    gamma(h) measures mean-square continuity, but extremal dependence
    (do nearby points spike TOGETHER?) lives in the copula, which the
    rank transform F isolates — theta -> 1 means joint extremes,
    -> 2 means extremes strike independently. This is what gpd_tail's
    per-cell margins cannot see and what spatial risk aggregation
    (regional flood/heat totals) actually needs.

    Exact throughout: F uses integer MID-ranks of the 1e-2-quantized
    values (doubled to stay integral: r2 = 2·cum_less + cnt + 1, a
    tie-invariant assignment), built from the value-domain-bounded
    cumulative table (the rank_sum_shift posture) and BROADCAST onto
    the points; per-bin sums of |r2_i − r2_j| are exact BIGINTs
    (headroom |r2| ≤ 2n ⇒ sdr ≤ 2n·N(h): n < ~2e9 points at 1e9
    pairs/bin). The same ONE 3x3 bucketed candidate join as the
    variogram family serves all bins via conditional sums; bin 0
    opens at 0 (co-located pairs excluded).

    Output: one row per bin (lo_m, hi_m, n_pairs, fmadogram,
    ext_coef, mean_d_m), floats round(.,6)."""
    nx, rs = _svg_params(bounds_m, cell_deg, lat_max)
    from .cluster import cell_id_sql
    from .crs import _pf

    _, cx, cy = cell_id_sql(cell_deg, lon, lat)
    q = f"CAST(round(({value}) * {_SVG_SCALE}.0E0, 0) AS BIGINT)"
    pts = df.filter(F.expr(
        f"abs({lat}) <= {_pf(lat_max)} AND ({value}) IS NOT NULL"
    )).selectExpr(
        f"{eid} AS e", f"{lon} AS lo", f"{lat} AS la", f"{q} AS qv",
        f"{cx} AS cx", f"{cy} AS cy",
    )
    vc = pts.groupBy("qv").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    w = Window.orderBy("qv").rowsBetween(Window.unboundedPreceding, -1)
    rk = vc.select(
        "qv",
        (2 * F.coalesce(F.sum("c").over(w), F.lit(0)) + F.col("c") + 1)
        .cast("bigint").alias("r2"),
    )
    ntot = pts.groupBy().agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    base = pts.join(F.broadcast(rk), "qv")
    soffs = ", ".join(
        f"struct({dx} AS dx, {dy} AS dy)"
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)
    )
    a = base.selectExpr(
        "e AS ea", "lo AS loa", "la AS laa", "r2 AS ra",
        "cx", "cy", f"explode(array({soffs})) AS o",
    ).selectExpr(
        "ea", "loa", "laa", "ra",
        f"((cx + o.dx + {nx}) % {nx}) AS jx", "(cy + o.dy) AS jy",
    )
    b = base.selectExpr(
        "e AS eb", "lo AS lob", "la AS lab", "r2 AS rb",
        "cx AS jx", "cy AS jy",
    )
    hav = haversine_m_sql("loa", "laa", "lob", "lab")
    mm = f"CAST(round({hav} * 1000.0E0) AS BIGINT)"
    lo_mm = 0
    conds = []
    for i, r in enumerate(rs):
        hi_mm = int(round(r * 1000))
        conds.append((i, f"(d_mm > {lo_mm} AND d_mm <= {hi_mm})"))
        lo_mm = hi_mm
    sums = (
        a.join(b, ["jx", "jy"])
        .filter(F.expr(
            f"ea < eb AND {mm} <= {int(round(rs[-1] * 1000))}"
        ))
        .selectExpr(
            f"{mm} AS d_mm", "abs(ra - rb) AS dr",
        )
        .agg(*[
            F.expr(e).alias(nme)
            for i, c in conds
            for e, nme in (
                (f"CAST(coalesce(sum(CASE WHEN {c} THEN 1 ELSE 0 "
                 f"END), 0) AS BIGINT)", f"n{i}"),
                (f"CAST(coalesce(sum(CASE WHEN {c} THEN dr END), 0) "
                 f"AS BIGINT)", f"s{i}"),
                (f"CAST(coalesce(sum(CASE WHEN {c} THEN d_mm END), "
                 f"0) AS BIGINT)", f"m{i}"),
            )
        ])
    )
    lo = 0.0
    stk = []
    for i, r in enumerate(rs):
        stk.append(
            f"struct(CAST({_pf(lo)} AS DOUBLE) AS lo_m, "
            f"CAST({_pf(r)} AS DOUBLE) AS hi_m, "
            f"n{i} AS n_pairs, s{i} AS sdr, m{i} AS smm)"
        )
        lo = r
    return (
        sums.crossJoin(F.broadcast(ntot))
        .selectExpr("n", f"explode(array({', '.join(stk)})) AS s")
        .selectExpr(
            "s.lo_m AS lo_m", "s.hi_m AS hi_m",
            "s.n_pairs AS n_pairs", "s.sdr AS sdr", "s.smm AS smm",
            "n",
        )
        .selectExpr("lo_m", "hi_m", "n_pairs", *_fmado_out_sql())
    )


def fmadogram_sql(
    src_sql: str,
    value: str,
    bounds_m: list,
    cell_deg: float,
    lat_max: float,
    eid: str = "event_id",
    lon: str = "lon",
    lat: str = "lat",
) -> str:
    """BRUTE-FORCE oracle twin of :func:`fmadogram`: full un-bucketed
    pair scan over the same mid-rank transform, per-bin sums via a
    VALUES bin table — quadratic by design, sf0.01-sized."""
    _, rs = _svg_params(bounds_m, cell_deg, lat_max)
    from .crs import _pf

    q = f"CAST(round(({value}) * {_SVG_SCALE}.0E0, 0) AS BIGINT)"
    hav = haversine_m_sql("a.lo", "a.la", "b.lo", "b.la")
    mm = f"CAST(round({hav} * 1000.0E0) AS BIGINT)"
    lo = 0.0
    vals = []
    for r in rs:
        vals.append(
            f"(CAST({_pf(lo)} AS DOUBLE), CAST({_pf(r)} AS DOUBLE), "
            f"{int(round(lo * 1000))}, {int(round(r * 1000))})"
        )
        lo = r
    outs = ", ".join(_fmado_out_sql())
    return (
        f"WITH p0 AS (SELECT {eid} AS e, {lon} AS lo, {lat} AS la, "
        f"{q} AS qv FROM ({src_sql}) s "
        f"WHERE abs({lat}) <= {_pf(lat_max)} "
        f"AND ({value}) IS NOT NULL), "
        f"vc AS (SELECT qv, CAST(count(*) AS BIGINT) AS c FROM p0 "
        f"GROUP BY qv), "
        f"rk AS (SELECT qv, CAST(2 * coalesce(sum(c) OVER "
        f"(ORDER BY qv ROWS BETWEEN UNBOUNDED PRECEDING AND "
        f"1 PRECEDING), 0) + c + 1 AS BIGINT) AS r2 FROM vc), "
        f"nt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM p0), "
        f"e AS (SELECT p0.e, p0.lo, p0.la, rk.r2 FROM p0 "
        f"JOIN rk ON p0.qv = rk.qv), "
        f"pr AS (SELECT {mm} AS d_mm, abs(a.r2 - b.r2) AS dr "
        f"FROM e a JOIN e b ON a.e < b.e "
        f"WHERE {mm} <= {int(round(rs[-1] * 1000))}), "
        f"bins(lo_m, hi_m, lo_mm, hi_mm) AS (VALUES {', '.join(vals)}), "
        f"agg AS (SELECT lo_m, hi_m, "
        f"CAST(count(d_mm) AS BIGINT) AS n_pairs, "
        f"CAST(coalesce(sum(dr), 0) AS BIGINT) AS sdr, "
        f"CAST(coalesce(sum(d_mm), 0) AS BIGINT) AS smm "
        f"FROM bins LEFT JOIN pr "
        f"ON d_mm > lo_mm AND d_mm <= hi_mm "
        f"GROUP BY lo_m, hi_m) "
        f"SELECT lo_m, hi_m, n_pairs, {outs} "
        f"FROM agg CROSS JOIN nt"
    )


# ------------------- mark correlation function (Stoyan kmm) --


def _kmm_out_sql() -> tuple:
    """Shared projection over (n_pairs, spp, smm, n, sq): Stoyan's
    normalized mark product kmm(h) = (spp/n_pairs) / (sq/n)² — the
    value-quantum scale cancels exactly between numerator and
    denominator, so kmm = spp·n² / (n_pairs·sq²) needs no descaling.
    Every factor is an exact BIGINT cast to DOUBLE; the arithmetic is
    the identical shared expression both engines. NULL for empty bins
    or an all-zero mark sum; mean pair distance for plotting."""
    np_ = "nullif(CAST(n_pairs AS DOUBLE), 0.0E0)"
    return (
        f"round(CAST(spp AS DOUBLE) * CAST(n AS DOUBLE) "
        f"* CAST(n AS DOUBLE) / ({np_} "
        f"* nullif(CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE), 0.0E0)), "
        f"6) AS kmm",
        f"round(CAST(smm AS DOUBLE) / 1000.0E0 / {np_}, 6) AS mean_d_m",
    )


def mark_correlation(
    df: DataFrame,
    value: str,
    bounds_m: list,
    cell_deg: float,
    lat_max: float,
    eid: str = "event_id",
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Mark correlation function kmm(h) (Stoyan & Stoyan 1994;
    spatstat's ``markcorr`` with the product test function) — the
    MARKED companion to :func:`semivariogram`: where gamma(h) measures
    how mark DIFFERENCES grow with distance, kmm(h) measures whether
    marks on nearby points are conditionally large (kmm > 1) or small
    (kmm < 1) relative to independent marking (kmm = 1). Per half-open
    lag bin (lo, hi]: kmm = E[m_i·m_j | d in bin] / m̄², estimated as
    (spp/N(h)) / (sq/n)² with spp the pair-product sum, sq the mark
    sum, n the band point count — the 1e-2 value quantum CANCELS, so
    no descaling constant appears.

    Exact and never a cross product: the ONE 3x3 bucket candidate join
    at cell width >= max(bounds) is validated complete (the ripley
    cover argument); marks quantize to BIGINT at 1e-2 units BEFORE any
    arithmetic so per-bin product sums are exact integers
    (order-independent); distances accumulate as BIGINT millimeters;
    ALL bins share the one join via conditional sums. NULL marks are
    filtered on BOTH sides (the r4 ADVICE lesson); bin 0 opens at 0
    (co-located pairs excluded, like the semivariogram). Headroom:
    |spp| <= N(h)·(max|q|)² — same 2.5e9-pairs-per-bin class as the
    semivariogram at a 600-unit spread, documented there.

    Output: one row per bin (lo_m, hi_m, n_pairs, kmm, mean_d_m),
    floats round(.,6).
    """
    nx, rs = _svg_params(bounds_m, cell_deg, lat_max)
    from .cluster import cell_id_sql
    from .crs import _pf

    _, cx, cy = cell_id_sql(cell_deg, lon, lat)
    q = f"CAST(round(({value}) * {_SVG_SCALE}.0E0, 0) AS BIGINT)"
    base = df.filter(F.expr(
        f"abs({lat}) <= {_pf(lat_max)} AND ({value}) IS NOT NULL"
    )).selectExpr(
        f"{eid} AS e", f"{lon} AS lo", f"{lat} AS la", f"{q} AS qv",
        f"{cx} AS cx", f"{cy} AS cy",
    )
    glob = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("qv").cast("bigint").alias("sq"),
    )
    soffs = ", ".join(
        f"struct({dx} AS dx, {dy} AS dy)"
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)
    )
    a = base.selectExpr(
        "e AS ea", "lo AS loa", "la AS laa", "qv AS qa",
        "cx", "cy", f"explode(array({soffs})) AS o",
    ).selectExpr(
        "ea", "loa", "laa", "qa",
        f"((cx + o.dx + {nx}) % {nx}) AS jx", "(cy + o.dy) AS jy",
    )
    b = base.selectExpr(
        "e AS eb", "lo AS lob", "la AS lab", "qv AS qb",
        "cx AS jx", "cy AS jy",
    )
    hav = haversine_m_sql("loa", "laa", "lob", "lab")
    mm = f"CAST(round({hav} * 1000.0E0) AS BIGINT)"
    lo_mm = 0
    conds = []
    for i, r in enumerate(rs):
        hi_mm = int(round(r * 1000))
        conds.append((i, f"(d_mm > {lo_mm} AND d_mm <= {hi_mm})"))
        lo_mm = hi_mm
    sums = (
        a.join(b, ["jx", "jy"])
        .filter(F.expr(
            f"ea < eb AND {mm} <= {int(round(rs[-1] * 1000))}"
        ))
        .selectExpr(f"{mm} AS d_mm", "qa * qb AS pp")
        .agg(*[
            F.expr(e).alias(nme)
            for i, c in conds
            for e, nme in (
                (f"CAST(coalesce(sum(CASE WHEN {c} THEN 1 ELSE 0 END), "
                 f"0) AS BIGINT)", f"n{i}"),
                (f"CAST(coalesce(sum(CASE WHEN {c} THEN pp END), 0) "
                 f"AS BIGINT)", f"s{i}"),
                (f"CAST(coalesce(sum(CASE WHEN {c} THEN d_mm END), 0) "
                 f"AS BIGINT)", f"m{i}"),
            )
        ])
    )
    lo = 0.0
    stk = []
    for i, r in enumerate(rs):
        stk.append(
            f"struct(CAST({_pf(lo)} AS DOUBLE) AS lo_m, "
            f"CAST({_pf(r)} AS DOUBLE) AS hi_m, "
            f"n{i} AS n_pairs, s{i} AS spp, m{i} AS smm)"
        )
        lo = r
    return (
        sums.crossJoin(F.broadcast(glob))
        .selectExpr(f"explode(array({', '.join(stk)})) AS s", "n", "sq")
        .selectExpr(
            "s.lo_m AS lo_m", "s.hi_m AS hi_m",
            "s.n_pairs AS n_pairs", "s.spp AS spp", "s.smm AS smm",
            "n", "sq",
        )
        .selectExpr("lo_m", "hi_m", "n_pairs", *_kmm_out_sql())
    )


def mark_correlation_sql(
    src_sql: str,
    value: str,
    bounds_m: list,
    cell_deg: float,
    lat_max: float,
    eid: str = "event_id",
    lon: str = "lon",
    lat: str = "lat",
) -> str:
    """BRUTE-FORCE oracle twin of :func:`mark_correlation`: the full
    un-bucketed pair scan, per-bin sums via a VALUES bin table
    LEFT-joined on the half-open interval — independently proving the
    engine's bucket cover complete. Quadratic by design: sf0.01-sized,
    like the semivariogram oracle."""
    _, rs = _svg_params(bounds_m, cell_deg, lat_max)
    from .crs import _pf

    q = f"CAST(round(({value}) * {_SVG_SCALE}.0E0, 0) AS BIGINT)"
    hav = haversine_m_sql("a.lo", "a.la", "b.lo", "b.la")
    mm = f"CAST(round({hav} * 1000.0E0) AS BIGINT)"
    lo = 0.0
    vals = []
    for r in rs:
        vals.append(
            f"(CAST({_pf(lo)} AS DOUBLE), CAST({_pf(r)} AS DOUBLE), "
            f"{0}, {int(round(lo * 1000))}, {int(round(r * 1000))})"
        )
        lo = r
    return (
        f"WITH e AS (SELECT {eid} AS e, {lon} AS lo, {lat} AS la, "
        f"{q} AS qv FROM ({src_sql}) s "
        f"WHERE abs({lat}) <= {_pf(lat_max)} "
        f"AND ({value}) IS NOT NULL), "
        f"gmom AS (SELECT CAST(count(*) AS BIGINT) AS n, "
        f"CAST(coalesce(sum(qv), 0) AS BIGINT) AS sq FROM e), "
        f"pr AS (SELECT {mm} AS d_mm, a.qv * b.qv AS pp "
        f"FROM e a JOIN e b ON a.e < b.e "
        f"WHERE {mm} <= {int(round(rs[-1] * 1000))}), "
        f"bins(lo_m, hi_m, _z, lo_mm, hi_mm) AS "
        f"(VALUES {', '.join(vals)}), "
        f"agg AS (SELECT lo_m, hi_m, "
        f"CAST(count(d_mm) AS BIGINT) AS n_pairs, "
        f"CAST(coalesce(sum(pp), 0) AS BIGINT) AS spp, "
        f"CAST(coalesce(sum(d_mm), 0) AS BIGINT) AS smm "
        f"FROM bins LEFT JOIN pr "
        f"ON d_mm > lo_mm AND d_mm <= hi_mm "
        f"GROUP BY lo_m, hi_m) "
        f"SELECT lo_m, hi_m, n_pairs, "
        + ", ".join(_kmm_out_sql())
        + " FROM agg CROSS JOIN gmom"
    )


# ----------------- G / F / J point-pattern functions (van Lieshout) --


def _gfj_grid(grid_deg: float, lat_max: float) -> list:
    """Deterministic empty-space test lattice: cell centers of a
    grid_deg graticule, kept only where the full cell sits inside the
    |lat| <= lat_max study band (|lat_c| <= lat_max − grid_deg/2), so
    every test point measures true in-band empty space. Computed once
    in Python and embedded as literals in BOTH dialects — the two
    engines see bit-identical coordinates."""
    if grid_deg <= 0 or 360.0 % grid_deg != 0.0:
        raise ValueError(
            f"grid_deg must divide 360, got {grid_deg}"
        )
    nlon = int(round(360.0 / grid_deg))
    pts = []
    j = 0
    while True:
        lat_c = -lat_max + (j + 0.5) * grid_deg
        if lat_c > lat_max - grid_deg / 2.0 + 1e-12:
            break
        for i in range(nlon):
            lon_c = -180.0 + (i + 0.5) * grid_deg
            pts.append((len(pts), lon_c, lat_c))
        j += 1
    if not pts:
        raise ValueError(
            f"grid_deg={grid_deg} leaves no test points inside "
            f"|lat| <= {lat_max}"
        )
    return pts


def _gfj_out_sql(n_grid: int) -> tuple:
    """Shared projection over (r_m, n, cnt_g, cnt_f): the empirical
    CDFs and the van Lieshout–Baddeley J. Ghat = P(NN dist <= r),
    Fhat = P(empty-space dist <= r); J = (1−G)/(1−F), NULL where
    F = 1 (J undefined). J > 1 dispersed, < 1 clustered, = 1 CSR."""
    g = (
        "(CAST(nn_le AS DOUBLE) "
        "/ nullif(CAST(n_events AS DOUBLE), 0.0E0))"
    )
    f = f"(CAST(empty_le AS DOUBLE) / {float(n_grid)!r}E0)"
    return (
        f"round({g}, 6) AS g_hat",
        f"round({f}, 6) AS f_hat",
        f"round((1.0E0 - {g}) / nullif(1.0E0 - {f}, 0.0E0), 6) AS j_hat",
    )


def gfj_functions(
    df: DataFrame,
    radii_m: list,
    grid_deg: float,
    cell_deg: float,
    lat_max: float,
    eid: str = "event_id",
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """The G / F / J point-pattern functions (Diggle 2003; van
    Lieshout & Baddeley 1996) — the distance-CDF complement of Ripley's
    K that completes the repo's point-pattern suite (K/L, cross-K,
    Clark-Evans NN index, quadrat CSR): Ĝ(r) = fraction of events whose
    nearest-neighbor distance is <= r; F̂(r) = fraction of a
    deterministic test lattice whose nearest EVENT is <= r (the
    empty-space function); Ĵ(r) = (1−Ĝ)/(1−F̂) (CSR ⇒ J ≡ 1, clustered
    < 1, dispersed > 1 — J needs no intensity normalization, unlike K).

    EXACT at every requested radius despite the bounded search: the
    3x3 bucket cover at cell width >= max(radii) is validated complete
    (:func:`_ripley_params`), so any point whose true NN is <= max(r)
    finds it, and a point whose NN exceeds max(r) is correctly counted
    in NO numerator — the bound censors nothing the CDFs at r <=
    max(radii) can see (unlike the nn_index MEAN, which must report
    coverage). Naive estimator: no border correction (lon wraps; the
    lat band truncation biases G up / F up only within max(r) of the
    band edge, documented like ripley_k); test points sit a half-cell
    inside the band by construction.

    Two bounded bucket joins (events→events NN, lattice→events
    empty-space), each followed by a per-point min and ONE conditional-
    sum aggregation serving ALL radii; the lattice is a bounded Python-
    computed literal table embedded bit-identically in both dialects.

    Output: one row per radius (r_m, n_events, n_grid, nn_le, empty_le,
    g_hat, f_hat, j_hat), floats round(.,6).
    """
    nx, rs, _ = _ripley_params(radii_m, cell_deg, lat_max)
    from .cluster import cell_id_sql
    from .crs import _pf

    grid = _gfj_grid(grid_deg, lat_max)
    n_grid = len(grid)
    R_mm = int(round(rs[-1] * 1000))
    _, cx, cy = cell_id_sql(cell_deg, lon, lat)
    base = df.filter(F.expr(f"abs({lat}) <= {_pf(lat_max)}")).selectExpr(
        f"{eid} AS e", f"{lon} AS lo", f"{lat} AS la",
        f"{cx} AS cx", f"{cy} AS cy",
    )
    n_df = base.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    soffs = ", ".join(
        f"struct({dx} AS dx, {dy} AS dy)"
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)
    )
    b = base.selectExpr(
        "e AS eb", "lo AS lob", "la AS lab", "cx AS jx", "cy AS jy",
    )
    hav = haversine_m_sql("loa", "laa", "lob", "lab")
    mm = f"CAST(round({hav} * 1000.0E0) AS BIGINT)"

    # events -> events nearest neighbor (G)
    a_e = base.selectExpr(
        "e AS ea", "lo AS loa", "la AS laa",
        "cx", "cy", f"explode(array({soffs})) AS o",
    ).selectExpr(
        "ea", "loa", "laa",
        f"((cx + o.dx + {nx}) % {nx}) AS jx", "(cy + o.dy) AS jy",
    )
    nn_e = (
        a_e.join(b, ["jx", "jy"])
        .filter(F.expr(f"ea != eb AND {mm} <= {R_mm}"))
        .selectExpr("ea", f"{mm} AS d_mm")
        .groupBy("ea").agg(F.min("d_mm").alias("nn_mm"))
        .agg(*[
            F.expr(
                f"CAST(coalesce(sum(CASE WHEN nn_mm <= "
                f"{int(round(r * 1000))} THEN 1 ELSE 0 END), 0) "
                f"AS BIGINT)"
            ).alias(f"g{i}")
            for i, r in enumerate(rs)
        ])
    )

    # lattice -> events empty-space distance (F); the lattice is a
    # bounded literal table, its cells derived by the SAME cell_id_sql
    cell0 = cell_id_sql(cell_deg, "glo", "gla")
    gstructs = ", ".join(
        f"struct({gid} AS gid, {_pf(lo_c)} AS glo, {_pf(la_c)} AS gla)"
        for gid, lo_c, la_c in grid
    )
    a_g = (
        df.sparkSession.range(1)
        .selectExpr(f"explode(array({gstructs})) AS g")
        .selectExpr("g.gid AS gid", "g.glo AS glo", "g.gla AS gla")
        .selectExpr(
            "gid", "glo AS loa", "gla AS laa",
            f"{cell0[1]} AS cx", f"{cell0[2]} AS cy",
        )
        .selectExpr(
            "gid", "loa", "laa", f"explode(array({soffs})) AS o",
            "cx", "cy",
        )
        .selectExpr(
            "gid", "loa", "laa",
            f"((cx + o.dx + {nx}) % {nx}) AS jx", "(cy + o.dy) AS jy",
        )
    )
    nn_g = (
        a_g.join(b, ["jx", "jy"])
        .filter(F.expr(f"{mm} <= {R_mm}"))
        .selectExpr("gid", f"{mm} AS d_mm")
        .groupBy("gid").agg(F.min("d_mm").alias("nn_mm"))
        .agg(*[
            F.expr(
                f"CAST(coalesce(sum(CASE WHEN nn_mm <= "
                f"{int(round(r * 1000))} THEN 1 ELSE 0 END), 0) "
                f"AS BIGINT)"
            ).alias(f"f{i}")
            for i, r in enumerate(rs)
        ])
    )

    stk = ", ".join(
        f"struct(CAST({_pf(r)} AS DOUBLE) AS r_m, g{i} AS cnt_g, "
        f"f{i} AS cnt_f)"
        for i, r in enumerate(rs)
    )
    return (
        nn_e.crossJoin(F.broadcast(nn_g)).crossJoin(F.broadcast(n_df))
        .selectExpr(f"explode(array({stk})) AS s", "n")
        .selectExpr(
            "s.r_m AS r_m", "n AS n_events",
            f"CAST({n_grid} AS BIGINT) AS n_grid",
            "s.cnt_g AS nn_le", "s.cnt_f AS empty_le",
        )
        .selectExpr(
            "r_m", "n_events", "n_grid", "nn_le", "empty_le",
            *_gfj_out_sql(n_grid),
        )
    )


def gfj_functions_sql(
    src_sql: str,
    radii_m: list,
    grid_deg: float,
    cell_deg: float,
    lat_max: float,
    eid: str = "event_id",
    lon: str = "lon",
    lat: str = "lat",
) -> str:
    """BRUTE-FORCE oracle twin of :func:`gfj_functions`: per-point /
    per-test-point min over the full un-bucketed scans with the same
    <= max(radii) bound, the lattice embedded as the IDENTICAL literal
    VALUES table — independently proving both bucket covers complete.
    Quadratic by design (sf0.01-sized, like knox/ripley)."""
    _, rs, _ = _ripley_params(radii_m, cell_deg, lat_max)
    from .crs import _pf

    grid = _gfj_grid(grid_deg, lat_max)
    n_grid = len(grid)
    R_mm = int(round(rs[-1] * 1000))
    hav_e = haversine_m_sql("a.lo", "a.la", "b.lo", "b.la")
    mm_e = f"CAST(round({hav_e} * 1000.0E0) AS BIGINT)"
    hav_g = haversine_m_sql("g.glo", "g.gla", "b.lo", "b.la")
    mm_g = f"CAST(round({hav_g} * 1000.0E0) AS BIGINT)"
    gvals = ", ".join(
        f"({gid}, CAST({_pf(lo_c)} AS DOUBLE), "
        f"CAST({_pf(la_c)} AS DOUBLE))"
        for gid, lo_c, la_c in grid
    )
    rvals = ", ".join(f"({_pf(r)})" for r in rs)
    return (
        f"WITH e AS (SELECT {eid} AS e, {lon} AS lo, {lat} AS la "
        f"FROM ({src_sql}) s WHERE abs({lat}) <= {_pf(lat_max)}), "
        f"nn0 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM e), "
        f"ne AS (SELECT a.e AS ea, min({mm_e}) AS nn_mm "
        f"FROM e a JOIN e b ON a.e != b.e "
        f"WHERE {mm_e} <= {R_mm} GROUP BY a.e), "
        f"gp(gid, glo, gla) AS (VALUES {gvals}), "
        f"ng AS (SELECT g.gid AS gid, min({mm_g}) AS nn_mm "
        f"FROM gp g JOIN e b ON {mm_g} <= {R_mm} GROUP BY g.gid), "
        f"rt(r_m) AS (SELECT CAST(v AS DOUBLE) "
        f"FROM (VALUES {rvals}) t(v)), "
        f"agg AS (SELECT r_m, "
        f"(SELECT CAST(count(*) AS BIGINT) FROM ne "
        f"WHERE ne.nn_mm <= CAST(round(rt.r_m * 1000.0E0) AS BIGINT)) "
        f"AS nn_le, "
        f"(SELECT CAST(count(*) AS BIGINT) FROM ng "
        f"WHERE ng.nn_mm <= CAST(round(rt.r_m * 1000.0E0) AS BIGINT)) "
        f"AS empty_le FROM rt) "
        f"SELECT r_m, n_events, "
        f"CAST({n_grid} AS BIGINT) AS n_grid, nn_le, empty_le, "
        + ", ".join(_gfj_out_sql(n_grid))
        + " FROM (SELECT agg.*, n AS n_events "
        f"FROM agg CROSS JOIN nn0) fin"
    )


# ------------------------- colocation quotient (category association) --


def _clq_out_sql() -> tuple:
    """Shared projection over (c_ab, n_a_nn, n_b, n_tot, same_cat):
    CLQ_{A→B} = (c_ab / n_a_nn) / ((n_b − [A=B]) / (n_tot − 1)). The
    numerator conditions on the censored A count (A points WITH an
    in-radius neighbor, replayed identically by the oracle); the
    denominator is the global category share among the other n−1
    points (Leslie & Kronenfeld 2011). NULL when degenerate."""
    num = (
        "(CAST(c_ab AS DOUBLE) "
        "/ nullif(CAST(n_a_nn AS DOUBLE), 0.0E0))"
    )
    den = (
        "(CAST(n_b - same_cat AS DOUBLE) "
        "/ nullif(CAST(n_tot - 1 AS DOUBLE), 0.0E0))"
    )
    return (
        f"round({num} / nullif({den}, 0.0E0), 6) AS clq",
        "round(CAST(n_a_nn AS DOUBLE) "
        "/ nullif(CAST(n_a AS DOUBLE), 0.0E0), 6) AS coverage_a",
    )


def colocation_quotient(
    df: DataFrame,
    cat: str,
    search_r_m: float,
    cell_deg: float,
    lat_max: float,
    eid: str = "event_id",
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Colocation quotient CLQ_{A→B} (Leslie & Kronenfeld 2011; the
    ArcGIS "Colocation Analysis" tool, k=1): for every ordered category
    pair, the share of A points whose nearest OTHER point is type B,
    normalized by B's global share among the other n−1 points —
    CLQ > 1 means A is attracted to B (asymmetric, unlike cross-K,
    which is symmetric in expectation under random labeling).

    Nearest neighbor is the TRUE deterministic NN within
    ``search_r_m``: candidates come from the validated-complete 3x3
    bucket cover (:func:`_ripley_params`), and the NN is selected by
    ``min_by`` over the exact BIGINT key d_mm·2³² + neighbor_id — a
    total order (ids unique), so engine and oracle pick the identical
    neighbor even under exact distance ties. Headroom: the key needs
    d_mm < 2³¹ (search_r < ~2147 km) — enforced by validation — and
    neighbor ids in [0, 2³²) — guarded by a raise_error CASE (the
    cross_k convention; the oracle replays the same data, so parity is
    by construction). A points with NO neighbor inside search_r are
    censored out of BOTH the numerator and the conditioned A count
    (``coverage_a`` reports the kept fraction per category, the
    nn_index convention); the global category shares use ALL band
    points. NULL categories are excluded up front.

    Output: one row per OBSERVED ordered pair (cat_a, cat_b, c_ab,
    n_a, n_a_nn, n_b, n_tot, clq, coverage_a), floats round(.,6).
    """
    nx, rs, _ = _ripley_params([search_r_m], cell_deg, lat_max)
    from .cluster import cell_id_sql
    from .crs import _pf

    R_mm = int(round(rs[0] * 1000))
    if R_mm >= 2 ** 31:
        raise ValueError(
            f"search_r_m={search_r_m} exceeds the 2^31-mm key headroom"
        )
    _, cx, cy = cell_id_sql(cell_deg, lon, lat)
    base = df.filter(F.expr(
        f"abs({lat}) <= {_pf(lat_max)} AND ({cat}) IS NOT NULL"
    )).selectExpr(
        f"{eid} AS e", f"{lon} AS lo", f"{lat} AS la",
        f"CAST({cat} AS STRING) AS tc",
        f"{cx} AS cx", f"{cy} AS cy",
    )
    cnt = base.groupBy(F.col("tc").alias("cat_b")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_b")
    )
    tot = base.agg(F.count(F.lit(1)).cast("bigint").alias("n_tot"))
    soffs = ", ".join(
        f"struct({dx} AS dx, {dy} AS dy)"
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)
    )
    a = base.selectExpr(
        "e AS ea", "lo AS loa", "la AS laa", "tc AS ta",
        "cx", "cy", f"explode(array({soffs})) AS o",
    ).selectExpr(
        "ea", "loa", "laa", "ta",
        f"((cx + o.dx + {nx}) % {nx}) AS jx", "(cy + o.dy) AS jy",
    )
    b = base.selectExpr(
        "e AS eb", "lo AS lob", "la AS lab", "tc AS tb",
        "cx AS jx", "cy AS jy",
    )
    hav = haversine_m_sql("loa", "laa", "lob", "lab")
    mm = f"CAST(round({hav} * 1000.0E0) AS BIGINT)"
    key = (
        f"(CASE WHEN eb BETWEEN 0 AND 4294967295 "
        f"THEN d_mm * 4294967296 + eb "
        f"ELSE CAST(raise_error('colocation_quotient: neighbor id "
        f"outside the 32-bit key domain') AS BIGINT) END)"
    )
    cab = (
        a.join(b, ["jx", "jy"])
        .filter(F.expr(f"ea != eb AND {mm} <= {R_mm}"))
        .selectExpr("ea", "ta", "eb", "tb", f"{mm} AS d_mm")
        .selectExpr("ea", "ta", "tb", f"{key} AS k")
        .groupBy("ea", "ta")
        .agg(F.expr("min_by(tb, k)").alias("nbt"))
        .groupBy(F.col("ta").alias("cat_a"), F.col("nbt").alias("cat_b"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("c_ab"))
    )
    nann = cab.groupBy(F.col("cat_a").alias("ta2")).agg(
        F.sum("c_ab").cast("bigint").alias("n_a_nn")
    )
    na = base.groupBy(F.col("tc").alias("ta3")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_a")
    )
    return (
        cab.join(F.broadcast(nann), cab.cat_a == F.col("ta2"))
        .join(F.broadcast(na), cab.cat_a == F.col("ta3"))
        .join(F.broadcast(cnt), "cat_b")
        .crossJoin(F.broadcast(tot))
        .selectExpr(
            "cat_a", "cat_b", "c_ab", "n_a", "n_a_nn", "n_b", "n_tot",
            "(CASE WHEN cat_a = cat_b THEN 1 ELSE 0 END) AS same_cat",
        )
        .selectExpr(
            "cat_a", "cat_b", "c_ab", "n_a", "n_a_nn", "n_b", "n_tot",
            *_clq_out_sql(),
        )
    )


def colocation_quotient_sql(
    src_sql: str,
    cat: str,
    search_r_m: float,
    cell_deg: float,
    lat_max: float,
    eid: str = "event_id",
    lon: str = "lon",
    lat: str = "lat",
) -> str:
    """BRUTE-FORCE oracle twin of :func:`colocation_quotient`: the NN
    of every point over the full un-bucketed pair scan via the SAME
    min_by(type, d_mm·2³² + id) total order and the same censoring —
    proving the bucketed NN true for every point. Quadratic by design
    (sf0.01-sized, like knox/nn_index)."""
    nx, rs, _ = _ripley_params([search_r_m], cell_deg, lat_max)
    from .crs import _pf

    R_mm = int(round(rs[0] * 1000))
    hav = haversine_m_sql("a.lo", "a.la", "b.lo", "b.la")
    mm = f"CAST(round({hav} * 1000.0E0) AS BIGINT)"
    return (
        f"WITH e AS (SELECT {eid} AS e, {lon} AS lo, {lat} AS la, "
        f"CAST({cat} AS STRING) AS tc FROM ({src_sql}) s "
        f"WHERE abs({lat}) <= {_pf(lat_max)} "
        f"AND ({cat}) IS NOT NULL), "
        f"tt AS (SELECT CAST(count(*) AS BIGINT) AS n_tot FROM e), "
        f"nb AS (SELECT tc AS cat_b, CAST(count(*) AS BIGINT) AS n_b "
        f"FROM e GROUP BY tc), "
        f"naa AS (SELECT tc AS ta3, CAST(count(*) AS BIGINT) AS n_a "
        f"FROM e GROUP BY tc), "
        f"nn AS (SELECT a.e AS ea, a.tc AS ta, "
        f"min_by(b.tc, ({mm}) * 4294967296 + b.e) AS nbt "
        f"FROM e a JOIN e b ON a.e != b.e "
        f"WHERE {mm} <= {R_mm} GROUP BY a.e, a.tc), "
        f"cab AS (SELECT ta AS cat_a, nbt AS cat_b, "
        f"CAST(count(*) AS BIGINT) AS c_ab FROM nn GROUP BY 1, 2), "
        f"nan AS (SELECT cat_a AS ta2, "
        f"CAST(sum(c_ab) AS BIGINT) AS n_a_nn FROM cab GROUP BY 1) "
        f"SELECT cat_a, cat_b, c_ab, n_a, n_a_nn, n_b, n_tot, "
        + ", ".join(_clq_out_sql())
        + " FROM (SELECT cab.*, n_a, n_a_nn, n_b, n_tot, "
        f"(CASE WHEN cat_a = cat_b THEN 1 ELSE 0 END) AS same_cat "
        f"FROM cab JOIN nan ON cat_a = ta2 "
        f"JOIN naa ON cat_a = ta3 "
        f"JOIN nb USING (cat_b) CROSS JOIN tt) fin"
    )
