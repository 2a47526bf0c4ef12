"""Regridding as a sparse-weight join — the reference's ESMF weight
application (``/root/reference/src/ocgis/regrid/base.py:646-839`` and the
chunked-smm CLI, ``ocli.py:282-305``) re-expressed relationally.

An ESMF weight file is a sparse matrix (row=dst cell, col=src cell, S):
applying it is exactly ``dst_value[row] = Σ S · src_value[col]`` — i.e.
a join of the source values with the weights table on the source cell id
followed by a grouped sum. Spark's hash join + partial aggregation IS the
sparse-matrix multiply; at scale the weights table is either broadcast
(coarse dst grids) or co-partitioned on src_id.

``conservative_weights`` builds the deterministic block-mean weight table
for an integer grid coarsening (factor f: each dst cell averages its f×f
source cells) — the fixture used by tests and the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..geo.cellindex import GridSpec


def conservative_weights(
    spark: SparkSession, src: GridSpec, factor: int
) -> DataFrame:
    """Weights for an f×f block-mean coarsening of ``src``:
    dst (ny/f × nx/f) cell ← mean of its f² source cells (S = 1/f²)."""
    assert src.nx % factor == 0 and src.ny % factor == 0
    dnx = src.nx // factor
    w = 1.0 / (factor * factor)
    cells = spark.range(src.nx * src.ny).select(
        F.col("id").alias("src_id"),
        (F.col("id") / src.nx).cast("int").alias("sy"),
        (F.col("id") % src.nx).cast("int").alias("sx"),
    )
    return cells.select(
        "src_id",
        (
            (F.col("sy") / factor).cast("int") * F.lit(dnx)
            + (F.col("sx") / factor).cast("int")
        ).cast("bigint").alias("dst_id"),
        F.lit(w).alias("s"),
    )


def apply_weights(
    src_values: DataFrame,
    weights: DataFrame,
    value: str = "value",
    src_id: str = "src_id",
    broadcast_weights: bool = True,
) -> DataFrame:
    """dst_value = Σ S·v over the weight rows of each destination cell,
    plus the weight sum (for partial-coverage normalization checks)."""
    w = F.broadcast(weights) if broadcast_weights else weights
    joined = src_values.join(w, src_values[src_id] == w["src_id"], "inner")
    return joined.groupBy("dst_id").agg(
        F.sum(F.col("s") * F.col(value)).alias("dst_value"),
        F.sum("s").alias("weight_sum"),
    )
