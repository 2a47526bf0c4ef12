"""Deterministic synthetic geospatial inputs, derived from the driver's
tables with arithmetic BOTH Spark SQL and DuckDB evaluate identically.

Why derivation instead of generation: the correctness gate
(``__spark_entry__.oracle_sql``) runs DuckDB over the same pre-registered
parquet views, so any input the engine consumes must be reconstructible in
pure SQL on both sides. Every document gets a deterministic (lon, lat)
inside the reference's golden grid extent via a multiplicative-hash
low-discrepancy fill (FIXTURES.md §1), plus a skew knob: 30 % of docs land
in one dense cell to exercise salting (north rule).

Grid layout mirrors the reference fixture
(``/root/reference/src/ocgis/test/test_simple/make_test_data.py:35-120``):
extent [-105.5, -101.5] x [36.5, 40.5]; the scaled document grid is 64x64
(res = 0.0625°); values follow the NW=1/NE=2/SW=3/SE=4 quadrant rule.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession

from .geo.cellindex import GridSpec

GOLDEN_GRID = GridSpec()  # 4x4 @ 1°
DOC_GRID = GOLDEN_GRID.scaled(64)  # 64x64 @ 0.0625°

# dense ("skew") cell for the hotspot knob: cell (y=44, x=20)
_DENSE_X, _DENSE_Y = 20, 44
SKEW_FRACTION_PCT = 30  # doc_id % 10 < 3


def _f(x: float) -> str:
    """Format a float so the literal parses identically in both dialects.

    E-notation forces a DOUBLE literal: DuckDB parses a bare 17-digit
    decimal as DECIMAL(17,14) and its decimal→double conversion (int/10^14
    in floating point) can be 1 ulp off the correctly-rounded string parse
    — enough to flip clip areas at the 1e-15 level. `1.5E0` parses as
    DOUBLE in BOTH Spark SQL and DuckDB."""
    r = repr(float(x))
    return r if ("e" in r or "E" in r or "inf" in r or "nan" in r) else r + "E0"


def lonlat_exprs(grid: GridSpec = DOC_GRID) -> tuple[str, str]:
    """Dialect-shared SQL expressions assigning each doc_id a deterministic
    (lon, lat). Uniform docs use two coprime multiplicative hashes; skewed
    docs are jittered strictly inside the dense cell."""
    res, w = grid.res, grid.lon1 - grid.lon0
    h = grid.lat1 - grid.lat0
    dlon0 = grid.lon0 + _DENSE_X * res
    dlat0 = grid.lat0 + _DENSE_Y * res
    lon = (
        f"CASE WHEN doc_id % 10 < 3 THEN {_f(dlon0)} + ({_f(res)} * 0.05) + "
        f"(CAST((doc_id * 97) % 997 AS DOUBLE) / 997.0) * ({_f(res)} * 0.9) "
        f"ELSE {_f(grid.lon0)} + (CAST((doc_id * 2654435761) % 1000003 AS DOUBLE) / 1000003.0) * {_f(w)} END"
    )
    lat = (
        f"CASE WHEN doc_id % 10 < 3 THEN {_f(dlat0)} + ({_f(res)} * 0.05) + "
        f"(CAST((doc_id * 89) % 991 AS DOUBLE) / 991.0) * ({_f(res)} * 0.9) "
        f"ELSE {_f(grid.lat0)} + (CAST((doc_id * 40503 + 12345) % 999983 AS DOUBLE) / 999983.0) * {_f(h)} END"
    )
    return lon, lat


def docs_geo_sql(grid: GridSpec = DOC_GRID, table: str = "documents") -> str:
    """SELECT deriving the geo-located document table. Runs verbatim in
    Spark SQL and DuckDB (the oracle embeds it as a subquery)."""
    lon, lat = lonlat_exprs(grid)
    # CAST: Spark parses bare `2.0` literals as DECIMAL, DuckDB as DOUBLE —
    # without the cast, averages of `value` diverge in rounding behavior
    value = (
        f"CAST(CASE WHEN cell_y >= {grid.ny // 2} THEN "
        f"CASE WHEN cell_x >= {grid.nx // 2} THEN 2.0 ELSE 1.0 END "
        f"ELSE CASE WHEN cell_x >= {grid.nx // 2} THEN 4.0 ELSE 3.0 END END "
        f"AS DOUBLE)"
    )
    return (
        "SELECT doc_id, text, lang, source, n_chars, lon, lat, cell_x, cell_y, "
        f"cell_y * {grid.nx} + cell_x AS cell_id, {value} AS value FROM ("
        "SELECT *, "
        f"CAST(floor((lon - ({_f(grid.lon0)})) / {_f(grid.res)}) AS INT) AS cell_x, "
        f"CAST(floor((lat - ({_f(grid.lat0)})) / {_f(grid.res)}) AS INT) AS cell_y "
        f"FROM (SELECT doc_id, text, lang, source, n_chars, {lon} AS lon, {lat} AS lat "
        f"FROM {table}) t0) t1"
    )


def cell_bounds_exprs(grid: GridSpec = DOC_GRID) -> dict[str, str]:
    """SQL expressions for the bounds of the cell owning (cell_x, cell_y)."""
    return {
        "lon_lb": f"{_f(grid.lon0)} + cell_x * {_f(grid.res)}",
        "lon_ub": f"{_f(grid.lon0)} + (cell_x + 1) * {_f(grid.res)}",
        "lat_lb": f"{_f(grid.lat0)} + cell_y * {_f(grid.res)}",
        "lat_ub": f"{_f(grid.lat0)} + (cell_y + 1) * {_f(grid.res)}",
    }


def register_docs_geo(
    spark: SparkSession, sf_dir: str, grid: GridSpec = DOC_GRID
) -> DataFrame:
    """Read the driver's documents parquet and derive the geo table."""
    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "documents"
    )
    return spark.sql(docs_geo_sql(grid))


# ---- non-uniform (vector-coordinate) grid fixture ----

def nonuniform_edges(
    lo: float, hi: float, n: int,
    pattern: tuple[float, ...] = (1.0, 1.75, 1.25, 2.0, 1.5),
) -> np.ndarray:
    """Deterministic non-uniform edge vector: cell widths cycle through
    ``pattern`` and are normalized to span [lo, hi] — a Gaussian-grid-like
    stretched axis. Computed ONCE driver-side; both the Spark operators
    (captured arrays) and the DuckDB oracle (VALUES literals) consume the
    identical floats, so parity is exact by construction."""
    w = np.array([pattern[i % len(pattern)] for i in range(n)], dtype="f8")
    cum = np.concatenate([[0.0], np.cumsum(w)])
    return lo + cum / cum[-1] * (hi - lo)


def _vg():
    from .geo.cellindex import VectorGridSpec

    return VectorGridSpec.from_edges(
        nonuniform_edges(GOLDEN_GRID.lon0, GOLDEN_GRID.lon1, 24),
        nonuniform_edges(GOLDEN_GRID.lat0, GOLDEN_GRID.lat1, 20),
    )


VEC_GRID = _vg()  # 24x20 stretched grid over the golden extent


def _vg_dst():
    from .geo.cellindex import VectorGridSpec

    return VectorGridSpec.from_edges(
        nonuniform_edges(GOLDEN_GRID.lon0, GOLDEN_GRID.lon1, 10,
                         pattern=(1.25, 1.0, 1.75)),
        nonuniform_edges(GOLDEN_GRID.lat0, GOLDEN_GRID.lat1, 8,
                         pattern=(2.0, 1.0, 1.5)),
    )


VEC_GRID_DST = _vg_dst()  # 10x8 differently-stretched destination grid


def vec_bounds_values_sql(vg=VEC_GRID) -> tuple[str, str]:
    """(vx, vy) VALUES tables of the non-uniform cell bounds — the oracle's
    twin of :func:`ocgis_spark.operators.vectorgrid.bounds_tables`.

    Every float column is CAST to DOUBLE: DuckDB parses long decimal
    literals as DECIMAL and would otherwise do exact decimal arithmetic on
    the bounds (≈2e-15 off the engine's IEEE-double results)."""
    xb, yb = vg.xb(), vg.yb()
    vx = ", ".join(
        f"({i}, {_f(xb[i])}, {_f(xb[i + 1])})" for i in range(vg.nx)
    )
    vy = ", ".join(
        f"({i}, {_f(yb[i])}, {_f(yb[i + 1])})" for i in range(vg.ny)
    )
    return (
        f"SELECT vcx, CAST(lon_lb AS DOUBLE) AS lon_lb, "
        f"CAST(lon_ub AS DOUBLE) AS lon_ub "
        f"FROM (VALUES {vx}) AS vx(vcx, lon_lb, lon_ub)",
        f"SELECT vcy, CAST(lat_lb AS DOUBLE) AS lat_lb, "
        f"CAST(lat_ub AS DOUBLE) AS lat_ub "
        f"FROM (VALUES {vy}) AS vy(vcy, lat_lb, lat_ub)",
    )


# ---- query geometries (FIXTURES.md §4 goldens, scaled grid) ----

def rect_ring(minx: float, miny: float, maxx: float, maxy: float) -> np.ndarray:
    return np.array(
        [[minx, miny], [maxx, miny], [maxx, maxy], [minx, maxy], [minx, miny]],
        dtype="f8",
    )


#: ugid=1 analogue on the doc grid: the golden 2°x2° interior box.
QUERY_RECT = (-104.5, 37.5, -102.5, 39.5)

#: convex pentagon for the exact-PIP path (CCW; covers the grid center).
QUERY_PENTAGON = np.array(
    [
        [-104.9, 38.0],
        [-103.1, 37.3],
        [-102.2, 38.9],
        [-103.3, 40.2],
        [-104.7, 39.8],
        [-104.9, 38.0],
    ],
    dtype="f8",
)

#: disjoint polygon (ugid=5 analogue — empty result / allow_empty path).
QUERY_DISJOINT = rect_ring(10.0, 10.0, 12.0, 12.0)

#: kNN query point (ugid=3 analogue, scaled grid).
QUERY_POINT = (-104.0, 38.5)


def rect_pred_sql(rect=QUERY_RECT, lon="lon", lat="lat") -> str:
    """Point-in-rectangle predicate (keep_touches=True: closed box)."""
    minx, miny, maxx, maxy = rect
    return (
        f"{lon} >= {_f(minx)} AND {lon} <= {_f(maxx)} AND "
        f"{lat} >= {_f(miny)} AND {lat} <= {_f(maxy)}"
    )


def convex_pred_sql(ring: np.ndarray = QUERY_PENTAGON, lon="lon", lat="lat") -> str:
    """Half-plane conjunction: point inside (or on) a CCW convex ring.
    Identical IEEE arithmetic in both engines → exact oracle for the
    two-phase PIP join."""
    terms = []
    for (x1, y1), (x2, y2) in zip(ring[:-1], ring[1:]):
        terms.append(
            f"(({_f(x2)} - {_f(x1)}) * ({lat} - {_f(y1)}) - "
            f"({_f(y2)} - {_f(y1)}) * ({lon} - {_f(x1)})) >= 0.0"
        )
    return " AND ".join(terms)


# ---- bilinear regrid fixture (dst points + per-cell src values) ----

#: 16x12 destination points strictly inside the DOC_GRID interior (no
#: stencil clamping), with non-integer fractional offsets so every corner
#: weight is non-trivial.
BILINEAR_NDST = 192


def bilinear_dst_exprs(grid: GridSpec = DOC_GRID) -> tuple[str, str]:
    """Dialect-shared (x, y) expressions for destination point dst_id."""
    jx = "CAST(dst_id % 16 AS DOUBLE)"
    jy = "CAST(floor(dst_id / 16) AS DOUBLE)"
    x = f"{_f(grid.lon0)} + {_f(grid.res)} * (1.7E0 + 3.8E0 * {jx})"
    y = f"{_f(grid.lat0)} + {_f(grid.res)} * (2.3E0 + 5.1E0 * {jy})"
    return x, y


#: per-cell source value that VARIES cell to cell (quadrant-constant
#: values would hide stencil index bugs).
BILINEAR_SRC_VALUE = "CAST((src_id * 31) % 97 AS DOUBLE)"


# ---- PII fixture: the synthetic corpus has no PII, so the driver query
# scans a deterministically derived contact-bearing column (the operator
# itself is pattern-driven; pytest covers realistic strings) ----

def pii_text_expr() -> str:
    """Dialect-shared expression appending synthetic contact info to each
    document: every doc gets an email, every third an SSN, two of five a
    phone — counts vary per doc so the oracle is non-trivial."""
    return (
        "concat(text, ' contact user', CAST(doc_id AS STRING), "
        "'@example.com ssn ', "
        "CASE WHEN doc_id % 3 = 0 THEN '123-45-6789' ELSE 'none' END, "
        "' phone ', "
        "CASE WHEN doc_id % 5 < 2 THEN concat('555-01', "
        "CAST(10 + doc_id % 90 AS STRING)) ELSE 'n/a' END)"
    )


#: per-language per-mille quota for the stratified-sampling fixture
#: (downsample dominant en, keep the rest at higher rates).
STRATIFIED_RATES = {"en": 200, "de": 500, "fr": 600, "es": 700, "zh": 900}


#: non-convex L-shaped selection == the union of two CLOSED axis rects —
#: the oracle is the disjunction of their range predicates, while the
#: engine sees ONE general (non-convex) ring, exercising the
#: interior/boundary split-covering PIP path end to end.
L_RECT_A = (-105.0, 37.0, -103.0, 38.5)
L_RECT_B = (-105.0, 38.5, -104.2, 40.0)
QUERY_LSHAPE = np.array(
    [
        [-105.0, 37.0], [-103.0, 37.0], [-103.0, 38.5], [-104.2, 38.5],
        [-104.2, 40.0], [-105.0, 40.0], [-105.0, 37.0],
    ],
    dtype="f8",
)


#: tiny quality lexicon over the synthetic vocabulary (fastText-scorer
#: fixture; real pipelines broadcast trained weights the same way).
LEXICON = {
    "fast": 0.8, "slow": -0.9, "value": 0.15, "table": -0.2,
    "spark": 0.5, "data": 0.1,
}
LEXICON_BIAS = -0.05


def para_text_sql(text: str = "text", key: str = "doc_id") -> str:
    """Paragraph-structured text synthesized deterministically from the
    flat fixture docs (dialect-neutral SQL; chr(10)-separated) — the
    paragraph_dedup fixture: two body paragraphs cut from the doc's own
    text, plus planted boilerplate ('subscribe now' in EVERY doc, a
    'cookie banner' in even docs, a per-doc-unique tail in odd docs), so
    a corpus-frequency threshold separates boilerplate from content. No
    external data (build-brief rule); shared by the Spark query and the
    DuckDB oracle so both see identical paragraphs."""
    return (
        f"concat(substr({text}, 1, 40), chr(10), "
        f"'subscribe now', chr(10), "
        f"CASE WHEN {key} % 2 = 0 THEN 'cookie banner' "
        f"ELSE concat('uniq tail ', CAST({key} AS STRING)) END, chr(10), "
        f"substr({text}, 41, 40))"
    )


# ---- geo-located event-stream fixture (trajectory family) ----

def events_geo_sql(
    ts_us: str = "epoch_us(ts)",
    table: str = "events",
    extra_cols: tuple = (),
) -> str:
    """Geo-located event stream: every event gets a deterministic
    (lon, lat) near its user's multiplicative-hash "home" point (global
    lon spread, lat in ±60°, per-event jitter ±0.25°), so per-entity
    tracks are LOCALIZED and trajectory statistics are physically
    meaningful. Dialect-shared except the epoch-micros expression —
    Spark passes ``unix_micros(CAST(ts AS TIMESTAMP))``, DuckDB the
    default ``epoch_us(ts)`` (CLAUDE.md timestamp convention)."""
    home_lon = (
        f"-180.0E0 + CAST((user_id * 2654435761) % 100003 AS DOUBLE) "
        f"/ 100003.0E0 * 360.0E0"
    )
    home_lat = (
        f"-60.0E0 + CAST((user_id * 40503 + 12345) % 99991 AS DOUBLE) "
        f"/ 99991.0E0 * 120.0E0"
    )
    jlon = f"CAST((event_id * 97 + 13) % 997 AS DOUBLE) / 997.0E0 * 0.5E0 - 0.25E0"
    jlat = f"CAST((event_id * 89 + 7) % 991 AS DOUBLE) / 991.0E0 * 0.5E0 - 0.25E0"
    extra = "".join(f", {c}" for c in extra_cols)
    return (
        f"SELECT event_id, user_id, {ts_us} AS ts_us, "
        f"({home_lon} + {jlon}) AS lon, "
        f"({home_lat} + {jlat}) AS lat{extra} "
        f"FROM {table}"
    )


def register_events_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read the driver's events parquet and derive the geo event table."""
    spark.read.parquet(f"{sf_dir}/events.parquet").createOrReplaceTempView(
        "events"
    )
    return spark.sql(
        events_geo_sql(ts_us="unix_micros(CAST(ts AS TIMESTAMP))")
    )


def replicate_events(spark: SparkSession, sf_dir: str, repl: int):
    """Deterministic event-stream scale-up shared by bench.py and
    scripts/bench_scaling.py (one definition — the published numbers
    must replicate identically): ``repl`` copies with DISTINCT user and
    event ids (id shifts far above any real id), registered as the
    ``events`` view, returning (geo_events_df, n_events_total).

    The small events table is BROADCAST against a well-partitioned
    range on the LEFT — the tiny parquet has ~1 row group, so streaming
    it instead would serialize the whole build on one core (the
    scaled_docs trap; do NOT 'fix' the broadcast side)."""
    from pyspark.sql import functions as F

    ev_raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    n_ev = ev_raw.count()
    scaled = (
        spark.range(int(repl)).withColumnRenamed("id", "copy")
        .crossJoin(F.broadcast(ev_raw))
        .withColumn(
            "user_id", F.col("user_id") + F.col("copy") * F.lit(1_000_000)
        )
        .withColumn(
            "event_id", F.col("event_id") + F.col("copy") * F.lit(n_ev)
        )
        .drop("copy")
    )
    scaled.createOrReplaceTempView("events")
    geo = spark.sql(
        events_geo_sql(ts_us="unix_micros(CAST(ts AS TIMESTAMP))")
    )
    return geo, n_ev * int(repl)
