#!/usr/bin/env python
"""spark-submit entry job: the flagship spatial-join + tile-assignment
pipeline over an interleaved document table, resumable from checkpoint.

    spark-submit --py-files dist/ocgis_spark.zip jobs/run_pipeline.py \
        --input /root/testdata/sf0.01 --output /tmp/pipeline_out --tdim 16

Stages: read documents → derive/attach spans + cell ids → two-phase
polygon subset → destination tile assignment → checkpointed per-tile
parquet write with lineage + metrics manifest rows. Re-running with the
same --output resumes from the last committed tile.
"""

from __future__ import annotations

import argparse
import os
import sys

# under spark-submit --py-files the zip is on the path; for a plain
# `python jobs/run_pipeline.py` dev run, fall back to the repo root
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="dir with documents.parquet")
    ap.add_argument("--output", required=True, help="checkpoint/output root")
    ap.add_argument("--tdim", type=int, default=16)
    ap.add_argument("--salt", type=int, default=0,
                    help="salt buckets for hot cell prefixes (0 = off)")
    args = ap.parse_args()

    spark = (
        SparkSession.builder.appName("ocgis_spark_pipeline")
        # engine-required semantics (master comes from spark-submit)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .getOrCreate()
    )

    from ocgis_spark import fixtures as FX
    from ocgis_spark import spans as SP
    from ocgis_spark.checkpoint import CheckpointManager, lineage_fingerprint
    from ocgis_spark.fixtures import DOC_GRID
    from ocgis_spark.operators import partitioning, spatial, tiling

    dg = FX.register_docs_geo(spark, args.input)
    docs = SP.with_spans(dg)
    sub = spatial.spatial_subset(
        spark, docs, DOC_GRID, [FX.QUERY_PENTAGON],
        operation="intersects", abstraction="point",
    )
    tiled = tiling.assign_dest_tiles(sub, DOC_GRID, args.tdim).select(
        "doc_uid", "cell_id", "tile_id",
        SP.span_signature_fast().alias("span_sig"),
        "doc_id",
    )
    if args.salt:
        tiled = partitioning.with_cell_prefix(
            tiled.withColumn("cell_y", (tiled.cell_id / DOC_GRID.nx).cast("int"))
            .withColumn("cell_x", (tiled.cell_id % DOC_GRID.nx).cast("int"))
        )
        hot = partitioning.detect_hot_keys(tiled, "cell_prefix")
        tiled = partitioning.salted_repartition(
            tiled, "cell_prefix", n_salt=args.salt, hot_keys=hot
        ).drop("cell_y", "cell_x", "cell_prefix", "salt")

    cp = CheckpointManager(args.output)
    lin = lineage_fingerprint(dg.select("doc_id"), ["doc_id"])
    res = cp.run_stage(spark, tiled.drop("doc_id"), lineage=lin)
    print(
        f"pipeline done: {len(res['processed'])} tiles processed, "
        f"{len(res['skipped'])} resumed-over, manifest at {cp.manifest_dir}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
