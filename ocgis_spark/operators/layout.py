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
    """Interleave two 16-bit non-negative ints: y bits odd, x bits even."""
    return _spread_bits(cell_x) + _spread_bits(cell_y) * F.lit(2)


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
    num_files: int = 8,
) -> None:
    """Write df as parquet laid out along the Z-curve: range-partition on
    the Morton key (one exchange; Spark samples range boundaries, so file
    sizes balance even under spatial skew) and sort within each file so
    row-group min/max statistics are tight."""
    keyed = df.withColumn("_zkey", morton_key(F.col(cell_x), F.col(cell_y)))
    (
        keyed.repartitionByRange(num_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
