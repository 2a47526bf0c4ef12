#!/usr/bin/env python
"""Long-form parquet → NetCDF-CF export job (cluster template; the
reverse of jobs/ingest_netcdf.py).

    spark-submit --py-files dist/ocgis_spark.zip jobs/export_netcdf.py \
        --input /lake/tas_parquet --output /data/tas_out.nc \
        [--variable value] [--units K]

Mirrors the reference's NetCDF converter (``/root/reference/src/ocgis/
conv/nc.py`` writing through ``driver/nc.py``): the engine's long-form
rows (ts, lat, lon, value) pivot back to the dense (time, lat, lat)
hyperslab, coordinate variables get CF attributes, and the data variable
records units + missing_value. netCDF4 is not in this container
(FIDELITY.md), so the import is guarded; the densification itself is
Spark-side (grouped sort → driver-bounded time slabs), only the final
array write runs on the driver."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

try:
    import netCDF4
    HAVE_NETCDF = True
except ImportError:  # pragma: no cover
    HAVE_NETCDF = False


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="long-form parquet dir")
    ap.add_argument("--output", required=True, help=".nc output path")
    ap.add_argument("--variable", default="value")
    ap.add_argument("--units", default="")
    args = ap.parse_args()
    if not HAVE_NETCDF:
        raise SystemExit(
            "netCDF4 is not installed here. This job is the cluster-side "
            "export template (FIDELITY.md): install netCDF4 and rerun."
        )

    import numpy as np
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.appName("ocgis_spark_export_netcdf")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    from ocgis_spark.ncmodel import coordinate_vectors, densify_slabs

    df = spark.read.parquet(args.input)
    times, lats, lons = coordinate_vectors(df, args.variable)

    ds = netCDF4.Dataset(args.output, "w")
    try:
        ds.createDimension("time", len(times))
        ds.createDimension("lat", len(lats))
        ds.createDimension("lon", len(lons))
        vt = ds.createVariable("time", "f8", ("time",))
        vt.units = "days since 1850-01-01"
        vt.calendar = "standard"
        vt.axis = "T"
        vt[:] = netCDF4.date2num(times, vt.units, vt.calendar)
        vy = ds.createVariable("lat", "f8", ("lat",))
        vy.units = "degrees_north"
        vy.axis = "Y"
        vy[:] = lats
        vx = ds.createVariable("lon", "f8", ("lon",))
        vx.units = "degrees_east"
        vx.axis = "X"
        vx[:] = lons
        vv = ds.createVariable(
            args.variable, "f8", ("time", "lat", "lon"), fill_value=np.nan
        )
        if args.units:
            vv.units = args.units
        # one distributed pass (sort + toLocalIterator), one slab of
        # driver memory at a time — NOT a filter-scan per time step
        for ti, _ts, slab in densify_slabs(df, times, lats, lons,
                                           args.variable):
            vv[ti] = slab
    finally:
        ds.close()
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
