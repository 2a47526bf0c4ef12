#!/usr/bin/env python
"""spark-submit entry job: rewrite a geo-located document table as a
Z-ordered parquet layout, then (optionally) demonstrate the pruned read.

    spark-submit --py-files dist/ocgis_spark.zip jobs/build_layout.py \
        --input /root/testdata/sf0.01 --output /tmp/zlake \
        --files 4096 [--probe-bbox 16,31,16,31]

At 100 TB this is the one-time layout pass that makes every later bbox
subset touch O(bbox) bytes: range-partition on the Morton key (Spark
samples boundaries, so files balance under spatial skew), sort within
files, persist the key column for row-group min/max pruning
(`ocgis_spark.operators.layout`). The probe reads the layout back via
`bbox_scan_zordered` and reports rows + the pushed Z-range count —
the cluster-scale analogue of the reference's GridChunker tiling
(`src/ocgis/spatial/grid_chunker.py`) expressed as data layout instead
of physical tiles.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="dir with documents.parquet")
    ap.add_argument("--output", required=True, help="layout output path")
    ap.add_argument("--files", type=int, default=64)
    ap.add_argument("--probe-bbox", default=None,
                    help="x0,x1,y0,y1 cell bbox to read back after the write")
    ap.add_argument("--pyramid-depth", type=int, default=None,
                    help="also write the quadtree rollup (levels 0..d) "
                         "next to the layout, Z-sorted per level")
    args = ap.parse_args()

    spark = (
        SparkSession.builder.appName("ocgis_spark_build_layout")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )

    from ocgis_spark import fixtures as FX
    from ocgis_spark.operators import layout

    dg = FX.register_docs_geo(spark, args.input)
    layout.zorder_write(dg, args.output, num_files=args.files)
    print(f"wrote z-ordered layout: {args.output} ({args.files} files)")

    if args.pyramid_depth is not None:
        # the serving rollup: one corpus shuffle + a bounded level merge
        # (layout.tile_pyramid); partitioned by level and Z-sorted within
        # each, so a tile server range-scans any resolution with the same
        # min/max row-group pruning as the base layout
        pyr = layout.tile_pyramid(dg, args.pyramid_depth, value="value")
        pdir = args.output.rstrip("/") + "_pyramid"
        (
            # range-partition on (level, zkey): level 0 holds nearly the
            # whole pyramid, so hashing on level alone would funnel it
            # through ONE writer task/file — range boundaries split hot
            # levels across tasks while keeping each file Z-sorted
            pyr.repartitionByRange(max(args.files // 4, 2), "level", "zkey")
            .sortWithinPartitions("level", "zkey")
            .write.mode("overwrite")
            .partitionBy("level")
            .parquet(pdir)
        )
        print(f"wrote tile pyramid (levels 0..{args.pyramid_depth}): {pdir}")

    if args.probe_bbox:
        x0, x1, y0, y1 = (int(v) for v in args.probe_bbox.split(","))
        ranges = layout.morton_ranges(x0, x1, y0, y1)
        sub = layout.bbox_scan_zordered(spark, args.output, x0, x1, y0, y1)
        print(
            f"probe bbox ({x0},{y0})-({x1},{y1}): {sub.count()} rows via "
            f"{len(ranges)} pushed Z-ranges"
        )

    spark.stop()


if __name__ == "__main__":
    main()
