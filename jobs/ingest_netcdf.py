#!/usr/bin/env python
"""One-time NetCDF-CF → parquet ingest job (cluster template).

    spark-submit --py-files dist/ocgis_spark.zip jobs/ingest_netcdf.py \
        --input /data/tas_day_*.nc --output /lake/tas_parquet \
        [--variable tas] [--chunk-rows 2000000]

This container ships no netCDF4, so the engine consumes parquet
(FIDELITY.md); THIS file is what a cluster user runs once per dataset to
produce that parquet. It mirrors the reference driver's axis discovery
(``/root/reference/src/ocgis/driver/nc.py:373-440``): CF ``axis`` /
``standard_name`` / ``units`` attributes map dimensions into the engine's
DimensionMap roles (time/level/y/x), bounds variables are honored, and the
dense array is melted to the long-form row model
``(time, [level,] lat, lon, value)`` the DataFrame engine operates on.

Design notes for 100 TB:
* files are ingested independently (one driver loop over files, each file
  streamed in row-group-sized chunks) — for fleets of files, run one job
  per shard or parallelize the file list with ``spark.range(...).flatMap``
  on executors that have netCDF4 installed;
* output is partitioned by time bucket so downstream time_range subsets
  prune partitions;
* cell indices are NOT precomputed here — ``spatial.encode_cells`` is a
  narrow map at query time and grids differ per query resolution.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

try:
    import netCDF4  # noqa: F401
    HAVE_NETCDF = True
except ImportError:  # pragma: no cover - not available in this container
    HAVE_NETCDF = False

# conversion semantics (axis discovery, melt) live in ocgis_spark.ncmodel
# so they are testable without netCDF4; this job keeps only the file
# open / num2date behind the guarded import
from ocgis_spark.ncmodel import (  # noqa: E402
    discover_dimension_map,
    melt_slabs,
    pick_data_variable,
)


def melt_file(path: str, variable: str | None, chunk_rows: int):
    """Yield pandas chunks of long-form rows from one NetCDF file."""
    import numpy as np

    ds = netCDF4.Dataset(path)
    try:
        dmap = discover_dimension_map(ds.variables)
        tvar = ds.variables[dmap["time"]]
        times = netCDF4.num2date(
            tvar[:], tvar.units,
            getattr(tvar, "calendar", "standard"),
            only_use_cftime_datetimes=False, only_use_python_datetimes=True,
        )
        lats = np.asarray(ds.variables[dmap["y"]][:], dtype="f8")
        lons = np.asarray(ds.variables[dmap["x"]][:], dtype="f8")
        if variable is None:
            variable = pick_data_variable(ds.variables, dmap)
        v = ds.variables[variable]

        def get_slab(t0, t1):
            return np.ma.filled(np.asarray(v[t0:t1], dtype="f8"), np.nan)

        yield from melt_slabs(times, lats, lons, get_slab, variable,
                              os.path.basename(path), chunk_rows)
    finally:
        ds.close()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="NetCDF glob")
    ap.add_argument("--output", required=True, help="parquet output dir")
    ap.add_argument("--variable", default=None)
    ap.add_argument("--chunk-rows", type=int, default=2_000_000)
    args = ap.parse_args()

    if not HAVE_NETCDF:
        raise SystemExit(
            "netCDF4 is not installed here. This job is the cluster-side "
            "ingest template (FIDELITY.md): install netCDF4 on the driver "
            "(or on executors for the distributed variant) and rerun."
        )

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("ocgis_spark_ingest_netcdf")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "false")
        .getOrCreate()
    )
    files = sorted(glob.glob(args.input))
    for path in files:
        for chunk in melt_file(path, args.variable, args.chunk_rows):
            from pyspark.sql import functions as F

            sdf = spark.createDataFrame(chunk)
            (
                sdf.withColumn("ts_month", F.date_format("ts", "yyyy-MM"))
                .write.mode("append")
                .partitionBy("ts_month")
                .parquet(args.output)
            )
    print(f"ingested {len(files)} files -> {args.output}")


if __name__ == "__main__":
    main()
