"""NetCDF-CF ↔ long-form row-model conversion logic, factored out of
``jobs/ingest_netcdf.py`` / ``jobs/export_netcdf.py`` so the semantics are
testable WITHOUT netCDF4 (not shipped in this container, FIDELITY.md):
the jobs keep only the file open / ``num2date`` / array write behind the
guarded import, everything else lives here.

Reference parity: CF axis discovery mirrors the metadata crawl of
``/root/reference/src/ocgis/driver/nc.py:373-440``; the melt produces the
``(ts, lat, lon, value)`` long form the DataFrame engine operates on, and
``densify_slabs`` is the inverse (the NetCDF converter's hyperslab,
``conv/nc.py``)."""

from __future__ import annotations

import numpy as np
import pandas as pd

#: CF axis discovery table (driver/nc.py:373-440): attribute → role
_AXIS_ATTRS = {
    "T": "time", "Z": "level", "Y": "y", "X": "x",
}
_STANDARD_NAMES = {
    "time": "time", "height": "level", "air_pressure": "level",
    "latitude": "y", "longitude": "x",
}


def discover_dimension_map(variables) -> dict[str, str]:
    """CF axis discovery: {role: variable_name} for time/level/y/x.

    ``variables``: any mapping name → object with optional ``axis`` /
    ``standard_name`` / ``units`` attributes (a ``netCDF4.Dataset
    .variables`` dict, or any duck-typed stand-in). Precedence per
    variable: ``axis`` attr, then ``standard_name``, then ``units``
    heuristics — the reference's crawl order."""
    dmap: dict[str, str] = {}
    for name, var in variables.items():
        axis = getattr(var, "axis", None)
        if axis in _AXIS_ATTRS:
            dmap.setdefault(_AXIS_ATTRS[axis], name)
            continue
        sn = getattr(var, "standard_name", None)
        if sn in _STANDARD_NAMES:
            dmap.setdefault(_STANDARD_NAMES[sn], name)
            continue
        units = str(getattr(var, "units", ""))
        if units.startswith(("days since", "hours since", "seconds since")):
            dmap.setdefault("time", name)
        elif units in ("degrees_north", "degree_north"):
            dmap.setdefault("y", name)
        elif units in ("degrees_east", "degree_east"):
            dmap.setdefault("x", name)
    missing = {"time", "y", "x"} - set(dmap)
    if missing:
        raise ValueError(f"CF axis discovery failed for roles {sorted(missing)}")
    return dmap


def pick_data_variable(variables, dmap: dict[str, str]) -> str:
    """First non-axis variable with rank >= 3 (the reference's default
    data-variable selection when none is named)."""
    roles = set(dmap.values())
    cands = [n for n, v in variables.items()
             if n not in roles and getattr(v, "ndim", 0) >= 3]
    if not cands:
        raise ValueError("no data variable of rank >= 3 found")
    return cands[0]


def melt_slabs(times, lats, lons, get_slab, variable: str, source: str,
               chunk_rows: int = 2_000_000):
    """Yield pandas chunks of long-form rows ``(ts, lat, lon, value,
    variable, source)`` from a dense (time, lat, lon) hyperslab accessor.

    ``get_slab(t0, t1)`` must return the ``(t1-t0, ny, nx)`` float array
    (masked values already filled with NaN). Chunks are time-major slabs
    sized so one chunk ≈ ``chunk_rows`` rows — the streaming shape that
    bounds ingest memory regardless of file size."""
    lats = np.asarray(lats, dtype="f8")
    lons = np.asarray(lons, dtype="f8")
    per_t = lats.size * lons.size
    step = max(1, chunk_rows // per_t)
    glon, glat = np.meshgrid(lons, lats)
    nt_total = len(times)
    for t0 in range(0, nt_total, step):
        t1 = min(t0 + step, nt_total)
        slab = np.asarray(get_slab(t0, t1), dtype="f8")
        nt = t1 - t0
        yield pd.DataFrame({
            "ts": np.repeat(times[t0:t1], per_t),
            "lat": np.tile(glat.ravel(), nt),
            "lon": np.tile(glon.ravel(), nt),
            "value": slab.reshape(nt, -1).ravel(),
            "variable": variable,
            "source": source,
        })


def coordinate_vectors(df, variable: str = "value"):
    """(times, lats, lons) sorted-distinct coordinate vectors of a
    long-form DataFrame (three small aggregations)."""
    lats = [r[0] for r in df.select("lat").distinct().orderBy("lat").collect()]
    lons = [r[0] for r in df.select("lon").distinct().orderBy("lon").collect()]
    times = [r[0] for r in df.select("ts").distinct().orderBy("ts").collect()]
    return times, lats, lons


def densify_slabs(df, times, lats, lons, variable: str = "value"):
    """Yield ``(time_index, ts, 2-D slab)`` in time order from long-form
    rows — the NetCDF export's hyperslab reconstruction.

    ONE distributed pass: ``orderBy(ts)`` + ``toLocalIterator`` streams
    sorted rows to the driver with bounded memory (one slab at a time),
    instead of one full filter-scan per time step. Missing cells stay
    NaN. The driver-side fill loop is inherent to a single-file ``.nc``
    write (the array write itself is serial)."""
    from pyspark.sql import functions as F  # noqa: F401

    lat_ix = {v: i for i, v in enumerate(lats)}
    lon_ix = {v: i for i, v in enumerate(lons)}
    t_ix = {v: i for i, v in enumerate(times)}
    cur = None
    slab = None
    for r in (
        df.select("ts", "lat", "lon", variable)
        .orderBy("ts", "lat", "lon")
        .toLocalIterator()
    ):
        if r["ts"] != cur:
            if cur is not None:
                yield t_ix[cur], cur, slab
            cur = r["ts"]
            slab = np.full((len(lats), len(lons)), np.nan)
        slab[lat_ix[r["lat"]], lon_ix[r["lon"]]] = r[variable]
    if cur is not None:
        yield t_ix[cur], cur, slab


def _attach_datum(attrs: dict, spec: dict) -> dict:
    """Carry file-declared datum attrs into the transform spec (the
    reference honors them through PROJ, ``crs.py:888-1030``): CF
    ``earth_radius`` forces the sphere; ``semi_major_axis`` +
    ``inverse_flattening``/``semi_minor_axis`` select the ellipsoidal
    closed forms in ``operators.crs``. Absent attrs keep the
    reference's Spherical default (crs.py:803)."""
    if attrs.get("earth_radius") is not None:
        spec["R"] = float(attrs["earth_radius"])
    elif attrs.get("semi_major_axis") is not None:
        spec["a"] = float(attrs["semi_major_axis"])
        if attrs.get("inverse_flattening") not in (None, 0, 0.0):
            spec["rf"] = float(attrs["inverse_flattening"])
        elif attrs.get("semi_minor_axis") is not None:
            spec["b"] = float(attrs["semi_minor_axis"])
    return spec


def crs_from_cf_attrs(attrs: dict):
    """Map a CF ``grid_mapping`` variable's attributes to a
    ``transform_crs`` spec — the reference's CF-metadata→CRS dispatch
    (``/root/reference/src/ocgis/variable/crs.py:888-1030`` with the
    concrete classes CFLambertConformal ``crs.py:1082``,
    CFAlbersEqualArea ``crs.py:1071``, CFPolarStereographic
    ``crs.py:1100``, CFRotatedPole ``crs.py:1134``, CFSpherical
    ``crs.py:1031``).

    Returns ``"EPSG:4326"`` for latitude_longitude, a parametric dict
    (``{'proj': 'lcc' | 'aea' | 'stere', ...}``) for the conic/polar
    family (consumed natively by ``operators.crs.transform_crs``), or a
    ``{'proj': 'rotated_pole', ...}`` dict for rotated lat-lon (consumed
    by ``operators.crs.transform_rotated_pole``)."""
    name = attrs.get("grid_mapping_name")
    if name in (None, "latitude_longitude"):
        return "EPSG:4326"

    def _pair(v):
        # CF standard_parallel: scalar or [lat_1, lat_2]
        if isinstance(v, (list, tuple, np.ndarray)):
            v = list(v)
            return float(v[0]), float(v[-1])
        return float(v), float(v)

    if name == "lambert_conformal_conic":
        lat1, lat2 = _pair(attrs["standard_parallel"])
        return _attach_datum(attrs, {
            "proj": "lcc", "lat_1": lat1, "lat_2": lat2,
            "lat_0": float(attrs.get("latitude_of_projection_origin", 0.0)),
            "lon_0": float(attrs.get("longitude_of_central_meridian", 0.0)),
            "x_0": float(attrs.get("false_easting", 0.0)),
            "y_0": float(attrs.get("false_northing", 0.0)),
        })
    if name == "albers_conical_equal_area":
        lat1, lat2 = _pair(attrs["standard_parallel"])
        return _attach_datum(attrs, {
            "proj": "aea", "lat_1": lat1, "lat_2": lat2,
            "lat_0": float(attrs.get("latitude_of_projection_origin", 0.0)),
            "lon_0": float(attrs.get("longitude_of_central_meridian", 0.0)),
            "x_0": float(attrs.get("false_easting", 0.0)),
            "y_0": float(attrs.get("false_northing", 0.0)),
        })
    if name == "polar_stereographic":
        spec = {
            "proj": "stere",
            "lat_0": float(attrs.get("latitude_of_projection_origin", 90.0)),
            "lon_0": float(
                attrs.get("straight_vertical_longitude_from_pole", 0.0)
            ),
            "x_0": float(attrs.get("false_easting", 0.0)),
            "y_0": float(attrs.get("false_northing", 0.0)),
        }
        # CF: exactly one of standard_parallel / scale_factor; the
        # reference defaults scale_factor to 1.0 (crs.py:1108-1113)
        if attrs.get("standard_parallel") is not None:
            spec["lat_ts"] = float(attrs["standard_parallel"])
        else:
            spec["k_0"] = float(
                attrs.get("scale_factor_at_projection_origin",
                          attrs.get("scale_factor", 1.0))
            )
        return _attach_datum(attrs, spec)
    if name == "transverse_mercator":
        # the reference maps this CF name to its NARCCAP oblique
        # Mercator (CFNarccapObliqueMercator, crs.py:1117-1130:
        # lonc/alpha/k_0, alpha defaulting to 360 ≡ transverse aspect)
        return {
            "proj": "omerc",
            "lat_0": float(attrs.get("latitude_of_projection_origin", 0.0)),
            "lonc": float(attrs.get("longitude_of_central_meridian", 0.0)),
            "alpha": float(attrs.get("alpha", 360.0)),
            "k_0": float(
                attrs.get("scale_factor_at_central_meridian", 1.0)
            ),
            "x_0": float(attrs.get("false_easting", 0.0)),
            "y_0": float(attrs.get("false_northing", 0.0)),
        }
    if name in ("rotated_latitude_longitude", "rotated_pole",
                "rotated_lat_lon"):
        return {
            "proj": "rotated_pole",
            "grid_north_pole_longitude": float(
                attrs["grid_north_pole_longitude"]
            ),
            "grid_north_pole_latitude": float(
                attrs["grid_north_pole_latitude"]
            ),
        }
    raise NotImplementedError(
        f"grid_mapping_name {name!r} has no native transform "
        "(supported: latitude_longitude, lambert_conformal_conic, "
        "albers_conical_equal_area, polar_stereographic, "
        "transverse_mercator, rotated_latitude_longitude)"
    )
