#!/usr/bin/env python
"""spark-submit entry: chunked sparse-matrix-multiply regrid — the
reference's ``ocli chunked-smm`` (``/root/reference/src/ocgis/ocli.py:
282-305``): apply regrid weights per destination tile, resumable, and
"insert" results into the global output by tile bounds (here: partitioned
parquet keyed by tile, exactly-once per tile via the checkpoint manifest).

    spark-submit --py-files dist/ocgis_spark.zip jobs/run_regrid.py \
        --input /root/testdata/sf0.01 --output /tmp/regrid_out \
        --factor 4 --tdim 4
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--factor", type=int, default=4, help="coarsening factor")
    ap.add_argument("--tdim", type=int, default=4, help="dst tiles per axis chunk")
    args = ap.parse_args()

    spark = (
        SparkSession.builder.appName("ocgis_spark_regrid")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "false")
        .getOrCreate()
    )

    from ocgis_spark import fixtures as FX
    from ocgis_spark.checkpoint import CheckpointManager, lineage_fingerprint
    from ocgis_spark.fixtures import DOC_GRID
    from ocgis_spark.operators import regrid

    dg = FX.register_docs_geo(spark, args.input)
    src = dg.select(
        F.col("cell_id").cast("bigint").alias("src_id"), "value"
    ).distinct()
    weights = regrid.conservative_weights(spark, DOC_GRID, args.factor)
    dst = regrid.apply_weights(src, weights, value="value")

    # destination tiling (chunked-smm insert-by-bounds analogue)
    dnx = DOC_GRID.nx // args.factor
    ntx = (dnx + args.tdim - 1) // args.tdim
    dst = dst.withColumn(
        "tile_id",
        (
            F.floor((F.col("dst_id") / dnx) / args.tdim) * ntx
            + F.floor((F.col("dst_id") % dnx) / args.tdim)
        ).cast("int"),
    )
    cp = CheckpointManager(args.output)
    lin = lineage_fingerprint(src, ["src_id", "value"])
    res = cp.run_stage(spark, dst, lineage=lin)
    print(
        f"regrid done: {len(res['processed'])} tiles processed, "
        f"{len(res['skipped'])} resumed-over"
    )
    spark.stop()


if __name__ == "__main__":
    main()
