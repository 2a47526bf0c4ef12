"""Explicit partitioning / skew control (north rule).

The reference's MPI decomposition splits one dimension contiguously with no
skew handling (``/root/reference/src/ocgis/vmachine/mpi.py:294-355``). Here
skew is first-class: dense-grid hotspots (e.g. 30 % of docs in one cell —
the fixtures' skew knob) are salted so one cell never pins one task.

* ``cell_prefix`` — coarse spatial key (cells grouped 8x8): the
  repartition/salting unit, preserving locality like a Z-prefix;
* ``salted_repartition`` — deterministic per-row salt from doc_id spreads
  each hot prefix over ``n_salt`` shuffle buckets;
* ``detect_hot_keys`` — sampled frequency scan → keys above threshold
  (driver-side broadcast list), so only genuinely hot keys get salted and
  aggregate merge cost stays bounded.

AQE's skew-join splitting complements this at join time; salting fixes
aggregation/partition skew AQE can't see.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PREFIX_SHIFT = 3  # 8x8 cell blocks


def with_cell_prefix(df: DataFrame) -> DataFrame:
    """Coarse spatial key: (cell_y >> 3) * 4096 + (cell_x >> 3)."""
    return df.withColumn(
        "cell_prefix",
        (
            F.shiftright(F.col("cell_y"), PREFIX_SHIFT) * F.lit(4096)
            + F.shiftright(F.col("cell_x"), PREFIX_SHIFT)
        ).cast("bigint"),
    )


def detect_hot_keys(
    df: DataFrame, key: str, fraction_threshold: float = 0.05,
    sample_fraction: float = 0.1,
) -> list:
    """Sampled hot-key detection: keys holding more than
    ``fraction_threshold`` of (sampled) rows."""
    sampled = df.sample(fraction=sample_fraction, seed=42)
    total = sampled.count()
    if total == 0:
        return []
    hot = (
        sampled.groupBy(key)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > total * fraction_threshold)
        .select(key)
        .collect()
    )
    return [r[0] for r in hot]


def salted_repartition(
    df: DataFrame,
    key: str = "cell_prefix",
    n_salt: int = 16,
    hot_keys: list | None = None,
    salt_source: str = "doc_id",
) -> DataFrame:
    """Repartition on (key, salt) where salt spreads only hot keys.
    Deterministic salt (pmod of the row id) keeps lineage reproducible for
    checkpoint/resume."""
    salt = F.pmod(F.col(salt_source), F.lit(n_salt)).cast("int")
    if hot_keys is not None:
        salt = F.when(F.col(key).isin(hot_keys), salt).otherwise(F.lit(0))
    out = df.withColumn("salt", salt)
    return out.repartition(F.col(key), F.col("salt"))
