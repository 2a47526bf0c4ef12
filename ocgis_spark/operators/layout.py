"""Space-filling-curve (Morton / Z-order) data layout.

The reference's answer to "lay data out so spatial subsets touch few
files" is its GridChunker tiling (``src/ocgis/spatial/grid_chunker.py``)
— rectangular tile decomposition at write time. On a 100 TB lake the
idiomatic Spark analogue is a Z-order layout: interleave the bits of the
(cell_x, cell_y) indices into one BIGINT key, range-partition + sort the
write by that key, and parquet min/max column statistics then prune both
files and row groups for any bbox predicate (a bbox is a small set of
Z-curve ranges, so each file's [min, max] key interval rarely straddles
the query).

Everything here is pure integer column math (multiplies + bitwise AND/OR
— dialect-neutral, so the DuckDB oracle reproduces keys bit-for-bit):
no UDF, no shuffle beyond the one range-exchange the write itself needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (low_mask, high_mask, multiplier) per part1by1 step: bits under
#: low_mask stay, bits under high_mask move up by log2(multiplier).
#: Carry-free formulation of the classic `x = (x | x<<k) & M` spread —
#: the two masked operands never overlap, so `+` is exact and no shift
#: operator is needed (dialect-neutral: only & and * and +).
_SPREAD = [
    (0x000000FF, 0x0000FF00, 256),
    (0x000F000F, 0x00F000F0, 16),
    (0x03030303, 0x0C0C0C0C, 4),
    (0x11111111, 0x22222222, 2),
]


def _spread_bits(c: Column) -> Column:
    """Spread the low 16 bits of c to even positions (part1by1)."""
    c = c.cast("bigint")
    for lo, hi, mult in _SPREAD:
        c = c.bitwiseAND(F.lit(lo)) + c.bitwiseAND(F.lit(hi)) * F.lit(mult)
    return c


def morton_key(cell_x: Column, cell_y: Column) -> Column:
    """Interleave two 16-bit non-negative ints: y bits odd, x bits even.

    Domain: [0, 65535] per axis — bits above 16 are silently dropped by
    the spread masks, so out-of-domain inputs COLLIDE. ``zorder_write``
    guards the domain with ``morton_key_checked`` (ADVICE r3)."""
    return _spread_bits(cell_x) + _spread_bits(cell_y) * F.lit(2)


def morton_key_checked(cell_x: Column, cell_y: Column,
                       ctx: str = "zorder_write") -> Column:
    """morton_key with an in-plan domain guard: any row outside
    [0, 65535]² raises at execution time (same single pass — no extra
    validation scan over the write input, which matters at 100 TB).
    ``ctx`` names the calling operator in the error."""
    ok = cell_x.between(0, 0xFFFF) & cell_y.between(0, 0xFFFF)
    err = F.raise_error(
        F.concat(
            F.lit(f"{ctx}: cell index outside [0, 65535]: ("),
            cell_x.cast("string"), F.lit(", "), cell_y.cast("string"),
            F.lit(") — keys would collide"),
        )
    )
    return F.when(ok, morton_key(cell_x, cell_y)).otherwise(err.cast("bigint"))


def spread_bits_sql(expr: str) -> str:
    """The same spread as a dialect-neutral SQL string (DuckDB oracle)."""
    s = f"CAST({expr} AS BIGINT)"
    for lo, hi, mult in _SPREAD:
        s = f"((({s}) & {lo}) + (({s}) & {hi}) * {mult})"
    return s


def morton_key_sql(x_expr: str, y_expr: str) -> str:
    return f"({spread_bits_sql(x_expr)}) + ({spread_bits_sql(y_expr)}) * 2"


def zorder_write(
    df: DataFrame, path: str, cell_x: str = "cell_x", cell_y: str = "cell_y",
    num_files: int = 8, key_col: str = "zkey",
) -> None:
    """Write df as parquet laid out along the Z-curve: range-partition on
    the Morton key (one exchange; Spark samples range boundaries, so file
    sizes balance even under spatial skew) and sort within each file so
    row-group min/max statistics are tight. The key column is PERSISTED
    (``key_col``) — that is what lets ``bbox_scan_zordered`` push Z-range
    predicates down to parquet row-group statistics on read. Cell indices
    outside the 16-bit non-negative Morton domain raise mid-write rather
    than silently colliding (ADVICE r3)."""
    keyed = df.withColumn(
        key_col, morton_key_checked(F.col(cell_x), F.col(cell_y))
    )
    (
        keyed.repartitionByRange(num_files, key_col)
        .sortWithinPartitions(key_col)
        .write.mode("overwrite")
        .parquet(path)
    )


def morton_ranges(
    x_lo: int, x_hi: int, y_lo: int, y_hi: int,
    bits: int = 16, max_ranges: int = 32,
) -> list[tuple[int, int]]:
    """Decompose an inclusive cell bbox into ≤ max_ranges inclusive
    Z-key intervals (quadtree descent, the BIGMIN idea): a quadrant fully
    inside the bbox contributes its whole contiguous Z-run; partial
    quadrants recurse. Runs driver-side over CELL indices (O(perimeter ·
    levels) nodes — independent of data size). Coarsening past
    ``max_ranges`` merges the smallest gaps, which only ADDS keys — safe
    because callers keep the exact bbox post-filter."""
    out: list[tuple[int, int]] = []

    def rec(level: int, zbase: int, cx: int, cy: int) -> None:
        s = 1 << level
        if cx + s - 1 < x_lo or cx > x_hi or cy + s - 1 < y_lo or cy > y_hi:
            return
        if cx >= x_lo and cx + s - 1 <= x_hi and cy >= y_lo and cy + s - 1 <= y_hi:
            out.append((zbase, zbase + (1 << (2 * level)) - 1))
            return
        h, sub = s >> 1, 1 << (2 * (level - 1))
        rec(level - 1, zbase, cx, cy)
        rec(level - 1, zbase + sub, cx + h, cy)
        rec(level - 1, zbase + 2 * sub, cx, cy + h)
        rec(level - 1, zbase + 3 * sub, cx + h, cy + h)

    rec(bits, 0, 0, 0)
    out.sort()
    merged: list[list[int]] = []
    for lo, hi in out:
        if merged and lo == merged[-1][1] + 1:
            merged[-1][1] = hi
        else:
            merged.append([lo, hi])
    while len(merged) > max_ranges:
        i = min(
            range(len(merged) - 1),
            key=lambda i: merged[i + 1][0] - merged[i][1],
        )
        merged[i][1] = merged[i + 1][1]
        del merged[i + 1]
    return [(lo, hi) for lo, hi in merged]


def polygon_scan_zordered(
    spark, path: str, spec, rings, key_col: str = "zkey",
    max_cells: int = 512, max_ranges: int = 32,
) -> DataFrame:
    """Read a Z-ordered layout for an ARBITRARY selection polygon: the
    adaptive multi-resolution covering
    (:func:`ocgis_spark.geo.cellindex.covering_z_ranges`, S2
    RegionCoverer analogue) becomes an OR-of-BETWEEN predicate on the
    persisted ``zkey``, pushed to parquet row-group statistics — so a
    diagonal or L-shaped selection, whose bbox envelope would touch
    nearly every file, decompresses only the row groups its Z intervals
    actually cross. Generalizes :func:`bbox_scan_zordered` (bbox-only
    ``morton_ranges``) to any polygon.

    Returns the COVERING SUPERSET (closed cell-intersects test coarsened
    by the node budget); exactness needs the polygon refine
    (``spatial.refine_points``) downstream — unlike the bbox scan there
    is no closed-form exact predicate to compose here.

    ``max_ranges`` gap-merges the interval list (same coarsening rule as
    ``morton_ranges``, default 32): the predicate is an OR chain over the
    persisted key ATTRIBUTE (cheap per branch — no expression
    re-expansion), but parquet filter evaluation and codegen both prefer
    a bounded chain; merging only widens the superset."""
    from ..geo.cellindex import covering_z_ranges

    ranges = covering_z_ranges(spec, rings, max_cells, max_ranges=max_ranges)
    df = spark.read.parquet(path)
    if not ranges:
        return df.limit(0)
    pred = F.lit(False)
    for lo, hi in ranges:
        pred = pred | F.col(key_col).between(F.lit(lo), F.lit(hi))
    return df.filter(pred)


def bbox_scan_zordered(
    spark, path: str, x_lo: int, x_hi: int, y_lo: int, y_hi: int,
    cell_x: str = "cell_x", cell_y: str = "cell_y", key_col: str = "zkey",
    bits: int = 16, max_ranges: int = 32,
) -> DataFrame:
    """Read a Z-ordered layout for a cell bbox: OR-of-BETWEEN Z-range
    predicates reach the parquet scan (PushedFilters), so row groups whose
    [min, max] zkey interval misses every range are never decompressed —
    at 100 TB the scan touches O(bbox) bytes, not O(corpus). The exact
    bbox predicate stays as the (also pushed) correctness filter, so the
    coarsened ranges never admit wrong rows."""
    df = spark.read.parquet(path)
    pred = F.lit(False)
    for lo, hi in morton_ranges(x_lo, x_hi, y_lo, y_hi, bits, max_ranges):
        pred = pred | F.col(key_col).between(F.lit(lo), F.lit(hi))
    return df.filter(pred).filter(
        F.col(cell_x).between(x_lo, x_hi) & F.col(cell_y).between(y_lo, y_hi)
    )


def tile_pyramid(
    df: DataFrame,
    depth: int,
    x: str = "cell_x",
    y: str = "cell_y",
    value: str | None = None,
) -> DataFrame:
    """Multi-resolution tile rollup (the prompt's "hypertable rollup"
    slot; the quadtree pyramid every tile-serving layer needs): level 0
    is the base cell grid, level d merges 2^d × 2^d base cells
    (parent = floor(child / 2), applied level by level). Emits per tile
    (level, px, py, zkey, n_docs[, value_sum]) — zkey is the Morton key
    of the tile at ITS OWN level, so a serving layer can range-scan any
    resolution with the same bbox_scan_zordered machinery.

    Plan shape at 100 TB: the corpus is shuffled ONCE (the base-cell
    groupBy, map-side partials); the pyramid is then one
    explode(levels) over the CELL-BOUNDED base table plus one grouped
    merge — two exchanges total, fan-out O(#cells · depth), never
    another corpus pass. (A per-level groupBy loop re-instantiates
    every lower level's subtree in each union branch — 1+2+…+depth
    exchanges — and a top-down explode straight off the corpus pushes
    depth+1 corpus copies through the shuffle; this shape avoids
    both.) Sums/counts merge exactly; float sums are rounded only at
    OUTPUT, after the merge.
    """
    if depth < 0:
        raise ValueError(f"tile_pyramid: depth must be >= 0, got {depth}")
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_docs")]
    merge = [F.sum("n_docs").alias("n_docs")]
    if value is not None:
        aggs.append(F.sum(value).alias("_vsum"))
        merge.append(F.sum("_vsum").alias("_vsum"))

    base = df.groupBy(
        F.col(x).cast("bigint").alias("bx"),
        F.col(y).cast("bigint").alias("by"),
    ).agg(*aggs)
    # parent at level d = floor(base / 2^d) (== iterated floor(·/2) for
    # non-negative ints); 2^d is exact in doubles for every sane depth
    scale = F.pow(F.lit(2.0), F.col("level"))
    fan = base.select(
        F.explode(F.sequence(F.lit(0), F.lit(depth))).alias("level"),
        "bx", "by", *(["n_docs", "_vsum"] if value is not None
                      else ["n_docs"]),
    ).select(
        F.col("level").cast("int").alias("level"),
        F.floor(F.col("bx") / scale).alias("px"),
        F.floor(F.col("by") / scale).alias("py"),
        *(["n_docs", "_vsum"] if value is not None else ["n_docs"]),
    )
    out = fan.groupBy("level", "px", "py").agg(*merge)
    cols = [
        "level", "px", "py",
        # CHECKED: base-level tiles outside the 16-bit Morton domain must
        # raise, not silently collide (the zorder_write guard, ADVICE r3
        # — r4s14 review extended it here); coarser levels only shrink,
        # and the check runs on tile-bounded rows, never the corpus
        morton_key_checked(F.col("px"), F.col("py"),
                           ctx="tile_pyramid").alias("zkey"),
        "n_docs",
    ]
    if value is not None:
        cols.append(F.round("_vsum", 6).alias("value_sum"))
    return out.select(*cols)


def tile_pyramid_sql(
    src_sql: str,
    depth: int,
    x: str = "cell_x",
    y: str = "cell_y",
    value: str | None = None,
) -> str:
    """Oracle twin of :func:`tile_pyramid` (DuckDB replays the pyramid
    top-down — parent at level d = floor(base / 2^d), equal to the
    engine's iterated floor(·/2) for non-negative ints — one
    explode(levels) cross join + one grouped agg)."""
    vcol = (f", round(sum({value}), 6) AS value_sum"
            if value is not None else "")
    vsel = ", value_sum" if value is not None else ""
    return (
        f"WITH src AS ({src_sql}), "
        f"lv AS (SELECT unnest(generate_series(0, {depth})) AS level), "
        f"cells AS (SELECT CAST(level AS INT) AS level, "
        f"CAST(floor({x} / power(CAST(2 AS DOUBLE), level)) AS BIGINT) "
        f"AS px, "
        f"CAST(floor({y} / power(CAST(2 AS DOUBLE), level)) AS BIGINT) "
        f"AS py"
        f"{', ' + value if value is not None else ''} "
        f"FROM src CROSS JOIN lv), "
        f"agg AS (SELECT level, px, py, "
        f"CAST(count(*) AS BIGINT) AS n_docs{vcol} "
        f"FROM cells GROUP BY level, px, py) "
        f"SELECT level, px, py, {morton_key_sql('px', 'py')} AS zkey, "
        f"n_docs{vsel} FROM agg"
    )


def tile_pyramid_distinct(
    df: DataFrame,
    depth: int,
    value: str,
    x: str = "cell_x",
    y: str = "cell_y",
) -> DataFrame:
    """Distinct-count tile pyramid: per-tile HLL estimate of
    ``count(distinct value)`` at every level (e.g. distinct sources per
    tile at every zoom — the rollup a crawl-coverage dashboard serves).
    Exact distinct cannot merge bottom-up (distinct sets don't add);
    HLL registers DO (parent register = max of child registers), so the
    pyramid pays the same bounded merge as :func:`tile_pyramid` instead
    of re-scanning the corpus per level.

    Plan shape at 100 TB: one corpus pass builds base-cell registers
    (map-side partial max ⇒ ≤ m rows/cell at the shuffle regardless of
    cardinality, the hll_sketch contract); the level fan-out and the
    (level, tile, bucket) max-merge run over REGISTER-bounded tables;
    the estimate is one bounded agg. Same checked Morton key contract
    as tile_pyramid."""
    from .sketch import H_MOD, hll_estimate, hll_sketch, md5_slice_int_sql

    if depth < 0:
        raise ValueError(f"tile_pyramid_distinct: depth must be >= 0, "
                         f"got {depth}")
    base = df.select(
        F.col(x).cast("bigint").alias("bx"),
        F.col(y).cast("bigint").alias("by"),
        "*",
    )
    # sketch.hash_sql needs an integer input BELOW 2^31 (its multiply
    # must stay inside BIGINT); md5-slice maps ANY value type (string
    # sources included) to a 32-bit BIGINT identically in both dialects,
    # and % H_MOD brings it under the bound (NULL propagates through
    # md5, so the sketch's NULL filter still drops missing values)
    vexpr = f"({md5_slice_int_sql(f'CAST({value} AS STRING)', 0)} % {H_MOD})"
    sk = hll_sketch(base, ["bx", "by"], vexpr)
    scale = F.pow(F.lit(2.0), F.col("level"))
    fan = sk.select(
        F.explode(F.sequence(F.lit(0), F.lit(depth))).alias("level"),
        "bx", "by", "bucket", "rho",
    ).select(
        F.col("level").cast("int").alias("level"),
        F.floor(F.col("bx") / scale).alias("px"),
        F.floor(F.col("by") / scale).alias("py"),
        "bucket", "rho",
    )
    merged = fan.groupBy("level", "px", "py", "bucket").agg(
        F.max("rho").alias("rho")
    )
    est = hll_estimate(merged, ["level", "px", "py"])
    return est.select(
        "level", "px", "py",
        morton_key_checked(F.col("px"), F.col("py"),
                           ctx="tile_pyramid_distinct").alias("zkey"),
        "est_distinct",
    )


def tile_pyramid_distinct_sql(
    src_sql: str,
    depth: int,
    value: str,
    x: str = "cell_x",
    y: str = "cell_y",
) -> str:
    """Oracle twin of :func:`tile_pyramid_distinct` — the engine-
    identical HLL (sketch.hll_estimate_sql) computed straight off the
    top-down exploded (level, px, py, value) rows; register max over
    the same row multiset == the engine's bottom-up merge."""
    from .sketch import H_MOD, hll_estimate_sql, md5_slice_int_sql

    cells = (
        f"(SELECT CAST(level AS INT) AS level, "
        f"CAST(floor({x} / power(CAST(2 AS DOUBLE), level)) AS BIGINT) "
        f"AS px, "
        f"CAST(floor({y} / power(CAST(2 AS DOUBLE), level)) AS BIGINT) "
        f"AS py, {value} "
        f"FROM ({src_sql}) s CROSS JOIN "
        f"(SELECT unnest(generate_series(0, {depth})) AS level) lv) c"
    )
    inner = hll_estimate_sql(
        ["level", "px", "py"],
        f"({md5_slice_int_sql(f'CAST({value} AS STRING)', 0)} % {H_MOD})",
        cells,
    )
    return (
        f"SELECT level, px, py, {morton_key_sql('px', 'py')} AS zkey, "
        f"est_distinct FROM ({inner}) e"
    )


#: standard geohash base-32 alphabet (no a/i/l/o)
GEOHASH32 = "0123456789bcdefghjkmnpqrstuvwxyz"
#: supported (even) precisions: p chars = 5p bits = 5p/2 per axis, and
#: the per-axis quantization must stay inside the 16-bit spread domain
_GH_PRECISIONS = (2, 4, 6)


def geohash_sql(lon: str, lat: str, precision: int = 6) -> str:
    """Standard geohash of (lon, lat) as ONE dialect-neutral SQL string
    (floor/least/greatest/% + the carry-free Morton spread — no UDF, no
    string loops). Even precisions only: p chars = 5p bits split evenly,
    so each axis quantizes to 5p/2 bits and the interleave is exactly
    :func:`morton_key_sql` with lon on the odd (high) positions — the
    geohash bit order (lon first from the MSB).

    Quantization is the closed form of the textbook bisection: the k-th
    bisection bit of x in [lo, hi) IS bit (n-1-k) of
    floor((x-lo)/(hi-lo) * 2^n). Inputs clamp into the edge cells
    (lat=90, lon=180 land in the top cell instead of overflowing).
    Nested floors make precisions PREFIX-CONSISTENT: geohash(p=4) is the
    first 4 chars of geohash(p=6) (pytest property).

    At 100 TB this is the layout/bucketing twin of the Morton key for
    data keyed by raw coordinates instead of grid cells: groupBy(geohash)
    is a plain hash aggregate, and prefix predicates prune like any
    string min/max statistic."""
    if precision not in _GH_PRECISIONS:
        raise ValueError(
            f"geohash_sql: precision must be one of {_GH_PRECISIONS} "
            f"(even, <= 6), got {precision}"
        )
    n = 5 * precision // 2          # bits per axis
    top = (1 << n) - 1
    lon_q = (f"least({top}, greatest(0, CAST(floor((({lon}) + 180.0E0) "
             f"/ 360.0E0 * {1 << n}) AS BIGINT)))")
    lat_q = (f"least({top}, greatest(0, CAST(floor((({lat}) + 90.0E0) "
             f"/ 180.0E0 * {1 << n}) AS BIGINT)))")
    v = f"({morton_key_sql(lat_q, lon_q)})"
    chars = ", ".join(
        f"substring('{GEOHASH32}', "
        f"CAST(floor({v} / {32 ** (precision - 1 - i)}) % 32 AS INT) + 1, 1)"
        for i in range(precision)
    )
    return f"concat({chars})"


def geohash_encode(
    df: DataFrame,
    precision: int = 6,
    lon: str = "lon",
    lat: str = "lat",
    out: str = "gh",
) -> DataFrame:
    """Append a geohash column (see :func:`geohash_sql`) — narrow map,
    0 exchanges, whole-stage codegen."""
    return df.withColumn(out, F.expr(geohash_sql(lon, lat, precision)))


def compact_bits_sql(expr: str) -> str:
    """Inverse of :func:`spread_bits_sql`: gather the bits sitting at
    even positions of ``expr`` (pattern 0x55555555) back into a dense
    16-bit value. Same carry-free trick run backwards — each step's two
    masked operands are disjoint after the mask, so `+` is exact and the
    floor-division "shift" never bleeds bits into the other operand
    (cross terms land outside the mask and are ANDed away)."""
    s = f"(CAST({expr} AS BIGINT) & {0x55555555})"
    for lo, hi, mult in reversed(_SPREAD):
        s = (f"((({s}) & {lo}) + "
             f"(CAST(floor(({s}) / {mult}) AS BIGINT) & {hi}))")
    return s


def geohash_decode_sql(gh: str, precision: int = 6) -> dict[str, str]:
    """Decode a geohash produced by :func:`geohash_sql` back to its cell
    — dialect-neutral SQL strings for the cell centre and bounds, keys
    ``lon_c lat_c lon_lo lon_hi lat_lo lat_hi``. Char values come from
    ``instr`` on the base-32 alphabet (1-based in BOTH dialects), the
    per-axis indices from the carry-free :func:`compact_bits_sql`, and
    the cell width is dyadic (360/2^n) so the float literals are exact
    in both engines. Assumes a well-formed even-precision geohash (the
    encoder's output); unknown chars give instr=0 → index −1 → garbage,
    not an error."""
    if precision not in _GH_PRECISIONS:
        raise ValueError(
            f"geohash_decode_sql: precision must be one of "
            f"{_GH_PRECISIONS}, got {precision}"
        )
    n = 5 * precision // 2
    z = " + ".join(
        f"(instr('{GEOHASH32}', substring({gh}, {i + 1}, 1)) - 1) "
        f"* {32 ** (precision - 1 - i)}"
        for i in range(precision)
    )
    z = f"CAST({z} AS BIGINT)"
    lat_i = compact_bits_sql(z)
    lon_i = compact_bits_sql(f"CAST(floor(({z}) / 2) AS BIGINT)")
    dlon, dlat = 360.0 / (1 << n), 180.0 / (1 << n)
    return {
        "lon_lo": f"(CAST({lon_i} AS DOUBLE) * {dlon!r}E0 - 180.0E0)",
        "lon_hi": f"((CAST({lon_i} AS DOUBLE) + 1.0E0) * {dlon!r}E0 - 180.0E0)",
        "lat_lo": f"(CAST({lat_i} AS DOUBLE) * {dlat!r}E0 - 90.0E0)",
        "lat_hi": f"((CAST({lat_i} AS DOUBLE) + 1.0E0) * {dlat!r}E0 - 90.0E0)",
        "lon_c": f"((CAST({lon_i} AS DOUBLE) + 0.5E0) * {dlon!r}E0 - 180.0E0)",
        "lat_c": f"((CAST({lat_i} AS DOUBLE) + 0.5E0) * {dlat!r}E0 - 90.0E0)",
    }


def geohash_decode(
    df: DataFrame,
    precision: int = 6,
    gh: str = "gh",
    fields: tuple = ("lon_c", "lat_c"),
) -> DataFrame:
    """Append decoded cell columns (see :func:`geohash_decode_sql`) —
    narrow map, 0 exchanges, whole-stage codegen."""
    exprs = geohash_decode_sql(gh, precision)
    out = df
    for f in fields:
        out = out.withColumn(f, F.expr(exprs[f]))
    return out
