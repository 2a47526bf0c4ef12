"""Coordinate wrapping + CRS transforms (pure column arithmetic).

Reference semantics:

* wrap/unwrap: vectorized ±360° on coordinate arrays
  (``/root/reference/src/ocgis/spatial/wrap.py:38-82``), wrapped-state
  detection against the 180th meridian (``variable/crs.py:358-376``,
  ``constants.py:135``);
* units conform: linear factor+offset conversion applied post-subset
  (``ops/engine.py:280-283``, ``variable/base.py:883-918``);
* spherical→cartesian (the ``Cartesian`` CRS, ``crs.py:811``) — pure
  trigonometry, used by tree/kNN paths on the sphere.

Full PROJ-backed transforms (rotated pole etc., ``crs.py:853+``) need
pyproj, absent from this container — the entry points exist and raise a
documented NotImplementedError so cluster deployments can wire pyproj in.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MERIDIAN_180TH = 180.0  # constants.py:135


def wrap_lon(lon) -> Column:
    """0..360 → -180..180 (``wrap.py:38-60``)."""
    c = F.col(lon) if isinstance(lon, str) else lon
    return F.when(c > MERIDIAN_180TH, c - 360.0).otherwise(c)


def unwrap_lon(lon) -> Column:
    """-180..180 → 0..360 (``wrap.py:62-82``)."""
    c = F.col(lon) if isinstance(lon, str) else lon
    return F.when(c < 0.0, c + 360.0).otherwise(c)


def is_wrapped_state(df: DataFrame, lon: str = "lon") -> str:
    """'wrapped' if any lon < 0, 'unwrapped' if any lon > 180, else
    'unknown' (``crs.py:358-376``)."""
    row = df.agg(
        F.min(lon).alias("lo"), F.max(lon).alias("hi")
    ).collect()[0]
    if row["lo"] is None:
        return "unknown"
    if row["lo"] < 0.0:
        return "wrapped"
    if row["hi"] > MERIDIAN_180TH:
        return "unwrapped"
    return "unknown"


def split_bbox_at_seam(
    minx: float, miny: float, maxx: float, maxy: float
) -> list[tuple[float, float, float, float]]:
    """Split a selection bbox that crosses the antimeridian into two boxes
    — the reference's unwrapped-target split (``crs.py:276-307``). Input in
    wrapped coordinates (-180..180) with ``minx > maxx`` signalling a seam
    crossing; output boxes are both seam-free."""
    if minx <= maxx:
        return [(minx, miny, maxx, maxy)]
    return [
        (minx, miny, MERIDIAN_180TH, maxy),
        (-MERIDIAN_180TH, miny, maxx, maxy),
    ]


def conform_units(
    df: DataFrame, value: str, factor: float, offset: float = 0.0,
    out: str | None = None,
) -> DataFrame:
    """Linear units conversion: v' = v·factor + offset (e.g. K→°C:
    factor=1, offset=-273.15; °C→°F: 1.8, 32)."""
    return df.withColumn(out or value, F.col(value) * F.lit(factor) + F.lit(offset))


def spherical_to_cartesian(
    df: DataFrame, lon: str = "lon", lat: str = "lat", radius: float = 1.0
) -> DataFrame:
    """Unit-sphere x/y/z columns (``Cartesian.transform_coordinates``)."""
    rlon, rlat = F.radians(F.col(lon)), F.radians(F.col(lat))
    return (
        df.withColumn("cart_x", F.lit(radius) * F.cos(rlat) * F.cos(rlon))
        .withColumn("cart_y", F.lit(radius) * F.cos(rlat) * F.sin(rlon))
        .withColumn("cart_z", F.lit(radius) * F.sin(rlat))
    )


def transform_crs(df: DataFrame, src_crs: str, dst_crs: str) -> DataFrame:
    """General PROJ transform — requires pyproj (not in this container).
    Mirrors ``update_crs`` (``geom.py:1131-1182``, ``grid.py:1104-1127``)."""
    try:
        import pyproj  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "transform_crs needs pyproj; install it on the cluster and "
            "implement as an Arrow pandas UDF over (lon, lat) batches"
        ) from e
    raise NotImplementedError("pyproj present but UDF wiring not implemented")
