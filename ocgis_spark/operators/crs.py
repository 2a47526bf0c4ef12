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

import math

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


def unwrap_rings_pieces(rings):
    """Prepare a selection polygon given in WRAPPED coords (-180..180] for
    subsetting UNWRAPPED (0..360) data — the reference's automatic
    geometry preparation (``prepare_geometry_variable``, ``crs.py:276-307``,
    wired in ``spatial_subset.py:264-277``), which round 1 left uncalled.

    Returns a list of polygon pieces (each ``[outer_ring]``), all seam-free
    in 0..360 space:

    * ring crossing the 180th meridian (consecutive |Δlon| > 180): unwrap
      its negative lons (+360) — it becomes CONTINUOUS in 0..360; 1 piece;
    * ring spanning lon 0 (mixed-sign lons, no 180 crossing): split at the
      unwrap seam; the western piece shifts +360; up to 2 pieces;
    * all-negative ring: shift +360; non-negative ring: unchanged.

    Holes travel with their outer (round 3, closing the r2 gap): on the
    unwrap path every ring's negative lons shift together; on the split
    path each hole is clipped by the same seam half-planes and its pieces
    attach to the matching outer piece (the generic S-H splitter handles
    rings uniformly — reference splits arbitrary geometries the same way,
    ``crs.py:276-307``)."""
    import numpy as np

    from ..geo import geometry as G

    all_rings = [np.asarray(r, dtype="f8") for r in rings]
    outer, holes = all_rings[0], all_rings[1:]
    lons = outer[:, 0]
    if np.abs(np.diff(lons)).max() > MERIDIAN_180TH:
        out = []
        for r in all_rings:
            r = r.copy()
            r[r[:, 0] < 0.0, 0] += 360.0
            out.append(r)
        return [out]
    if (lons < 0).any() and (lons >= 0).any():
        pieces = []
        east = G.clip_ring_by_box(outer, 0.0, -1e30, 1e30, 1e30)
        if len(east) >= 4:
            piece = [east]
            for h in holes:
                he = G.clip_ring_by_box(h, 0.0, -1e30, 1e30, 1e30)
                if len(he) >= 4 and abs(G.ring_area(he)) > G.EPS_AREA:
                    piece.append(he)
            pieces.append(piece)
        west = G.clip_ring_by_box(outer, -1e30, -1e30, 0.0, 1e30)
        if len(west) >= 4:
            w = west.copy()
            w[:, 0] += 360.0
            piece = [w]
            for h in holes:
                hw = G.clip_ring_by_box(h, -1e30, -1e30, 0.0, 1e30)
                if len(hw) >= 4 and abs(G.ring_area(hw)) > G.EPS_AREA:
                    hw = hw.copy()
                    hw[:, 0] += 360.0
                    piece.append(hw)
            pieces.append(piece)
        return pieces
    if (lons < 0).all():
        return [[(lambda r: r + np.array([360.0, 0.0]))(r.copy())
                 for r in all_rings]]
    return [all_rings]


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


def _clamp1(c: Column) -> Column:
    return F.greatest(F.least(c, F.lit(1.0)), F.lit(-1.0))


def rotated_to_lonlat(
    rlon, rlat, pole_lon: float, pole_lat: float
) -> tuple[Column, Column]:
    """CF rotated-pole → geographic, closed-form spherical trig as pure
    Catalyst column expressions (NO pyproj needed — the reference's
    ``CFRotatedPole`` detour, ``variable/crs.py:1134``,
    ``ops/engine.py:413-437``, shells out to PROJ ob_tran for exactly this
    rotation).

    Convention (CF ``grid_north_pole_longitude``/``latitude`` = λp, φp):
    the rotated system's north pole sits at geographic (λp, φp) and the
    rotated origin (0°, 0°) maps to (λp ± 180°, 90° − φp) — the familiar
    CORDEX layout (e.g. pole (−162, 39.25): origin → (18°E, 50.75°N)).

      φg = asin( sinφr·sinφp + cosφr·cosλr·cosφp )
      λg = λp + atan2( −cosφr·sinλr, sinφr·cosφp − cosφr·cosλr·sinφp )
    """
    rl = F.radians(rlon if isinstance(rlon, Column) else F.col(rlon))
    rp = F.radians(rlat if isinstance(rlat, Column) else F.col(rlat))
    sp, cp = F.sin(F.radians(F.lit(float(pole_lat)))), F.cos(F.radians(F.lit(float(pole_lat))))
    z = F.sin(rp) * sp + F.cos(rp) * F.cos(rl) * cp
    glat = F.degrees(F.asin(_clamp1(z)))
    glon = F.lit(float(pole_lon)) + F.degrees(
        F.atan2(-F.cos(rp) * F.sin(rl), F.sin(rp) * cp - F.cos(rp) * F.cos(rl) * sp)
    )
    # normalize to (-180, 180]
    glon = F.when(glon > 180.0, glon - 360.0).when(glon <= -180.0, glon + 360.0).otherwise(glon)
    return glon, glat


def lonlat_to_rotated(
    lon, lat, pole_lon: float, pole_lat: float
) -> tuple[Column, Column]:
    """Geographic → CF rotated-pole (inverse of :func:`rotated_to_lonlat`;
    same structure with λ′ = λ − λp):

      φr = asin( sinφg·sinφp + cosφg·cosλ′·cosφp )
      λr = atan2( −cosφg·sinλ′, sinφg·cosφp − cosφg·cosλ′·sinφp )
    """
    lo = lon if isinstance(lon, Column) else F.col(lon)
    la = F.radians(lat if isinstance(lat, Column) else F.col(lat))
    lp = F.radians(lo - F.lit(float(pole_lon)))
    sp, cp = F.sin(F.radians(F.lit(float(pole_lat)))), F.cos(F.radians(F.lit(float(pole_lat))))
    z = F.sin(la) * sp + F.cos(la) * F.cos(lp) * cp
    rlat = F.degrees(F.asin(_clamp1(z)))
    rlon = F.degrees(
        F.atan2(-F.cos(la) * F.sin(lp), F.sin(la) * cp - F.cos(la) * F.cos(lp) * sp)
    )
    return rlon, rlat


def rotated_pole_sql(
    rlon_expr: str, rlat_expr: str, pole_lon: float, pole_lat: float
) -> tuple[str, str]:
    """Dialect-neutral SQL twin of :func:`rotated_to_lonlat` (identical
    operation tree) for the DuckDB oracle."""
    sp = f"sin(radians({pole_lat!r}))"
    cp = f"cos(radians({pole_lat!r}))"
    rl = f"radians({rlon_expr})"
    rp = f"radians({rlat_expr})"
    z = f"sin({rp}) * {sp} + cos({rp}) * cos({rl}) * {cp}"
    glat = f"degrees(asin(greatest(least({z}, 1.0), -1.0)))"
    glon_raw = (
        f"{pole_lon!r} + degrees(atan2(-cos({rp}) * sin({rl}), "
        f"sin({rp}) * {cp} - cos({rp}) * cos({rl}) * {sp}))"
    )
    glon = (
        f"CASE WHEN ({glon_raw}) > 180.0 THEN ({glon_raw}) - 360.0 "
        f"WHEN ({glon_raw}) <= -180.0 THEN ({glon_raw}) + 360.0 "
        f"ELSE ({glon_raw}) END"
    )
    return glon, glat


def transform_rotated_pole(
    df: DataFrame,
    pole_lon: float,
    pole_lat: float,
    lon: str = "lon",
    lat: str = "lat",
    inverse: bool = False,
    out_lon: str = "glon",
    out_lat: str = "glat",
) -> DataFrame:
    """DataFrame-level rotated-pole transform (both directions) — pure
    column math, whole-stage codegen, zero shuffle."""
    fn = lonlat_to_rotated if inverse else rotated_to_lonlat
    glon, glat = fn(F.col(lon), F.col(lat), pole_lon, pole_lat)
    return df.withColumn(out_lon, glon).withColumn(out_lat, glat)


#: spherical web-mercator radius (EPSG:3857 uses the WGS84 semi-major)
_R_3857 = 6378137.0


def _norm_crs(crs: str) -> str:
    c = str(crs).strip().upper()
    return c if ":" in c else f"EPSG:{c}"


def _merc_cols(lon, lat):
    x = F.lit(_R_3857) * F.radians(lon)
    y = F.lit(_R_3857) * F.log(
        F.tan(F.lit(math.pi / 4.0) + F.radians(lat) / F.lit(2.0))
    )
    return x, y


def _merc_inv_cols(x, y):
    lon = F.degrees(x / F.lit(_R_3857))
    lat = F.degrees(
        F.lit(2.0) * F.atan(F.exp(y / F.lit(_R_3857))) - F.lit(math.pi / 2.0)
    )
    return lon, lat


def _eqc_cols(lon, lat):
    # EPSG:4087 world equidistant cylindrical (sphere): plate carrée scale
    return F.lit(_R_3857) * F.radians(lon), F.lit(_R_3857) * F.radians(lat)


def _eqc_inv_cols(x, y):
    return F.degrees(x / F.lit(_R_3857)), F.degrees(y / F.lit(_R_3857))


#: projections with closed spherical forms — expressed as pure Catalyst
#: columns (whole-stage codegen, zero Python), the in-container-tested
#: fast path; everything else goes through the pyproj Arrow UDF below
_NATIVE_TRANSFORMS = {
    ("EPSG:4326", "EPSG:3857"): _merc_cols,
    ("EPSG:3857", "EPSG:4326"): _merc_inv_cols,
    ("EPSG:4326", "EPSG:4087"): _eqc_cols,
    ("EPSG:4087", "EPSG:4326"): _eqc_inv_cols,
}

_TRANSFORMER_CACHE: dict = {}


def transform_crs(
    df: DataFrame,
    src_crs: str,
    dst_crs: str,
    lon: str = "lon",
    lat: str = "lat",
    out_x: str = "x",
    out_y: str = "y",
) -> DataFrame:
    """General CRS transform of coordinate columns — the reference's
    ``update_crs`` (``src/ocgis/variable/crs.py:458+``, applied at
    ``variable/geom.py:1131-1182`` / ``spatial/grid.py:1104-1127``).

    Spherical closed-form pairs (web mercator EPSG:3857, equidistant
    cylindrical EPSG:4087) run as pure Catalyst column math, as do the
    CF conic/polar parameter-dict CRSs (``{'proj': 'lcc' | 'aea' |
    'stere', ...}`` — reference CFLambertConformal/CFAlbersEqualArea/
    CFPolarStereographic, ``crs.py:1071-1113``; build the dict from CF
    attrs with ``ncmodel.crs_from_cf_attrs``). Arbitrary PROJ CRSs run
    through an Arrow pandas UDF with an executor-side cached
    ``pyproj.Transformer`` (``always_xy=True``) — one vectorized
    ``transform`` call per Arrow batch; raises NotImplementedError when
    pyproj is absent (not shipped in this container, FIDELITY.md)."""
    src_is_dict = isinstance(src_crs, dict)
    dst_is_dict = isinstance(dst_crs, dict)
    if (not src_is_dict and not dst_is_dict
            and _norm_crs(src_crs) == _norm_crs(dst_crs)):
        return df.withColumn(out_x, F.col(lon)).withColumn(out_y, F.col(lat))
    if src_is_dict or dst_is_dict:
        # a geographic dict ({'proj': 'longlat'/'latlong'}) is EPSG:4326
        # spelled as PROJ params — normalize BEFORE parametric dispatch
        # (transform_param_crs rejects 'longlat', so routing a geographic
        # dict there crashed every advertised geographic-dict pairing —
        # r4 review finding)
        if _is_geographic(src_crs) and _is_geographic(dst_crs):
            return df.withColumn(out_x, F.col(lon)).withColumn(
                out_y, F.col(lat)
            )
        if src_is_dict and _is_geographic(src_crs):
            return transform_crs(
                df, "EPSG:4326", dst_crs, lon=lon, lat=lat,
                out_x=out_x, out_y=out_y,
            )
        if dst_is_dict and _is_geographic(dst_crs):
            return transform_crs(
                df, src_crs, "EPSG:4326", lon=lon, lat=lat,
                out_x=out_x, out_y=out_y,
            )
        if _is_geographic(src_crs) and dst_is_dict:
            return transform_param_crs(
                df, dst_crs, lon=lon, lat=lat, out_x=out_x, out_y=out_y
            )
        if src_is_dict and _is_geographic(dst_crs):
            return transform_param_crs(
                df, src_crs, lon=lon, lat=lat, out_x=out_x, out_y=out_y,
                inverse=True,
            )
        if src_is_dict and dst_is_dict:
            if src_crs == dst_crs:
                return df.withColumn(out_x, F.col(lon)).withColumn(
                    out_y, F.col(lat)
                )
            # chain through geographic: inverse(src) then forward(dst) —
            # still two narrow column maps, one codegen stage
            mid = transform_param_crs(
                df, src_crs, lon=lon, lat=lat,
                out_x="_glon", out_y="_glat", inverse=True,
            )
            out = transform_param_crs(
                mid, dst_crs, lon="_glon", lat="_glat",
                out_x=out_x, out_y=out_y,
            )
            return out.drop("_glon", "_glat")
        # parametric <-> native closed-form EPSG (e.g. NARCCAP lcc ->
        # web mercator for tile pyramids): chain through geographic —
        # still narrow column maps in one codegen stage
        if src_is_dict and ("EPSG:4326", _norm_crs(dst_crs)) in _NATIVE_TRANSFORMS:
            mid = transform_param_crs(
                df, src_crs, lon=lon, lat=lat,
                out_x="_glon", out_y="_glat", inverse=True,
            )
            out = transform_crs(
                mid, "EPSG:4326", dst_crs, lon="_glon", lat="_glat",
                out_x=out_x, out_y=out_y,
            )
            return out.drop("_glon", "_glat")
        if dst_is_dict and (_norm_crs(src_crs), "EPSG:4326") in _NATIVE_TRANSFORMS:
            mid = transform_crs(
                df, src_crs, "EPSG:4326", lon=lon, lat=lat,
                out_x="_glon", out_y="_glat",
            )
            out = transform_param_crs(
                mid, dst_crs, lon="_glon", lat="_glat",
                out_x=out_x, out_y=out_y,
            )
            return out.drop("_glon", "_glat")
        raise NotImplementedError(
            "parametric CRS dicts compose with geographic (EPSG:4326 / "
            "{'proj': 'longlat'}), with each other, or with the native "
            f"closed-form EPSG pairs {sorted(set(k[1] for k in _NATIVE_TRANSFORMS if k[0] == 'EPSG:4326'))}"
        )
    key = (_norm_crs(src_crs), _norm_crs(dst_crs))
    if key[0] == key[1]:
        return df.withColumn(out_x, F.col(lon)).withColumn(out_y, F.col(lat))
    if key in _NATIVE_TRANSFORMS:
        cx, cy = _NATIVE_TRANSFORMS[key](F.col(lon), F.col(lat))
        return df.withColumn(out_x, cx).withColumn(out_y, cy)
    try:
        import pyproj  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            f"transform_crs {key[0]}->{key[1]} needs pyproj (only the "
            f"closed-form pairs {sorted(_NATIVE_TRANSFORMS)} are native); "
            "install pyproj on the cluster"
        ) from e

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    src, dst = key

    def _proj(lon_s, lat_s):
        import pyproj

        tr = _TRANSFORMER_CACHE.get((src, dst))
        if tr is None:
            tr = pyproj.Transformer.from_crs(src, dst, always_xy=True)
            _TRANSFORMER_CACHE[(src, dst)] = tr
        x, y = tr.transform(lon_s.to_numpy(), lat_s.to_numpy())
        return pd.DataFrame({"x": x, "y": y})

    proj = pandas_udf(_proj, "x double, y double")
    res = df.withColumn("_xy", proj(F.col(lon), F.col(lat)))
    return (
        res.withColumn(out_x, F.col("_xy.x"))
        .withColumn(out_y, F.col("_xy.y"))
        .drop("_xy")
    )


# ---------------------------------------------------------------------------
# CF conic / polar projection family — native closed-form spherical
# transforms (Snyder 1987, "Map Projections: A Working Manual", eqs
# 14-1..14-11 [Albers], 15-1..15-5 [Lambert conformal], 21-7..21-15
# [polar stereographic]). The reference ships these as PROJ-backed CF
# coordinate systems: CFLambertConformal
# (/root/reference/src/ocgis/variable/crs.py:1082), CFAlbersEqualArea
# (crs.py:1071), CFPolarStereographic (crs.py:1100) — the standard
# regional-climate-model CRSs (NARCCAP / CORDEX grids arrive in Lambert
# conformal). Here each is a pair of dialect-neutral SQL emitters
# (identical text runs in Spark SQL and DuckDB — the oracle twin is the
# SAME string), wrapped as Catalyst columns via F.expr: whole-stage
# codegen, zero Python, zero shuffle.
#
# Sphere radius defaults to the reference's Spherical semi-major
# (6370997.0, crs.py:803); override with params['R'].
# ---------------------------------------------------------------------------

R_SPHERE = 6370997.0  # reference Spherical default (crs.py:803)


def _pf(x: float) -> str:
    """Dialect-neutral DOUBLE literal (fixtures._f, imported lazily to
    keep operators importable without the fixtures module)."""
    from ..fixtures import _f

    return _f(x)


def _dlon_sql(lon: str, lon0: float) -> str:
    """(lon - lon0) wrapped into (-180, 180] — one CASE wrap (inputs are
    geographic degrees, |delta| < 540)."""
    d = f"(({lon}) - {_pf(lon0)})"
    return (
        f"(CASE WHEN {d} > 180.0E0 THEN {d} - 360.0E0 "
        f"WHEN {d} <= -180.0E0 THEN {d} + 360.0E0 ELSE {d} END)"
    )


def _wrap_out_sql(expr: str) -> str:
    """Wrap an inverse-transform longitude back into (-180, 180] — the
    raw atan2-based recovery lands in (lon0-180, lon0+180], which can
    exceed the wrapped domain for far-from-center points."""
    return (
        f"(CASE WHEN ({expr}) > 180.0E0 THEN ({expr}) - 360.0E0 "
        f"WHEN ({expr}) <= -180.0E0 THEN ({expr}) + 360.0E0 "
        f"ELSE ({expr}) END)"
    )


def _lcc_constants(p: dict) -> tuple[float, float, float, float]:
    """(n, R*F, rho0, R) for a Lambert-conformal-conic parameter dict."""
    R = float(p.get("R", p.get("a", R_SPHERE)))
    lat1 = math.radians(float(p["lat_1"]))
    lat2 = math.radians(float(p.get("lat_2", p["lat_1"])))
    lat0 = math.radians(float(p.get("lat_0", 0.0)))
    if abs(lat1 - lat2) < 1e-12:
        n = math.sin(lat1)
    else:
        n = math.log(math.cos(lat1) / math.cos(lat2)) / math.log(
            math.tan(math.pi / 4 + lat2 / 2) / math.tan(math.pi / 4 + lat1 / 2)
        )
    if abs(n) < 1e-12:
        raise ValueError("lcc: standard parallels symmetric about the "
                         "equator degenerate (n = 0); use mercator")
    Fc = math.cos(lat1) * math.tan(math.pi / 4 + lat1 / 2) ** n / n
    rho0 = R * Fc / math.tan(math.pi / 4 + lat0 / 2) ** n
    return n, R * Fc, rho0, R


def lcc_sql(p: dict, lon: str = "lon", lat: str = "lat") -> tuple[str, str]:
    """Forward Lambert conformal conic (sphere), Snyder 15-1..15-4:
    x = rho sin(theta) + x_0, y = rho0 - rho cos(theta) + y_0 with
    rho = R F / tan^n(pi/4 + phi/2), theta = n (lambda - lambda0)."""
    n, RF, rho0, _ = _lcc_constants(p)
    lon0 = float(p.get("lon_0", 0.0))
    x0, y0 = float(p.get("x_0", 0.0)), float(p.get("y_0", 0.0))
    rho = (
        f"({_pf(RF)} / power(tan(pi() / 4.0E0 + radians({lat}) / 2.0E0), "
        f"{_pf(n)}))"
    )
    theta = f"({_pf(n)} * radians({_dlon_sql(lon, lon0)}))"
    x = f"({rho} * sin({theta}) + {_pf(x0)})"
    y = f"({_pf(rho0 + y0)} - {rho} * cos({theta}))"
    return x, y


def lcc_inv_sql(p: dict, x: str = "x", y: str = "y") -> tuple[str, str]:
    """Inverse Lambert conformal conic (sphere), Snyder 15-5:
    phi = 2 atan((R F / rho)^(1/n)) - pi/2, lambda = lambda0 + theta/n."""
    n, RF, rho0, _ = _lcc_constants(p)
    lon0 = float(p.get("lon_0", 0.0))
    x0, y0 = float(p.get("x_0", 0.0)), float(p.get("y_0", 0.0))
    s = 1.0 if n >= 0 else -1.0
    xp = f"(({x}) - {_pf(x0)})"
    yp = f"({_pf(rho0)} - (({y}) - {_pf(y0)}))"
    rho = f"({_pf(s)} * sqrt({xp} * {xp} + {yp} * {yp}))"
    theta = f"atan2({_pf(s)} * {xp}, {_pf(s)} * {yp})"
    glat = (
        f"degrees(2.0E0 * atan(power({_pf(RF)} / {rho}, {_pf(1.0 / n)})) "
        f"- pi() / 2.0E0)"
    )
    glon = _wrap_out_sql(f"degrees({theta}) / {_pf(n)} + {_pf(lon0)}")
    return glon, glat


def _aea_constants(p: dict) -> tuple[float, float, float, float]:
    """(n, C, rho0, R) for an Albers-equal-area parameter dict."""
    R = float(p.get("R", p.get("a", R_SPHERE)))
    lat1 = math.radians(float(p["lat_1"]))
    lat2 = math.radians(float(p.get("lat_2", p["lat_1"])))
    lat0 = math.radians(float(p.get("lat_0", 0.0)))
    n = (math.sin(lat1) + math.sin(lat2)) / 2.0
    if abs(n) < 1e-12:
        raise ValueError("aea: standard parallels symmetric about the "
                         "equator degenerate (n = 0)")
    C = math.cos(lat1) ** 2 + 2.0 * n * math.sin(lat1)
    rho0 = R * math.sqrt(C - 2.0 * n * math.sin(lat0)) / n
    return n, C, rho0, R


def aea_sql(p: dict, lon: str = "lon", lat: str = "lat") -> tuple[str, str]:
    """Forward Albers equal-area conic (sphere), Snyder 14-1..14-4:
    rho = R sqrt(C - 2 n sin(phi)) / n, theta = n (lambda - lambda0)."""
    n, C, rho0, R = _aea_constants(p)
    lon0 = float(p.get("lon_0", 0.0))
    x0, y0 = float(p.get("x_0", 0.0)), float(p.get("y_0", 0.0))
    rho = (
        f"({_pf(R / n)} * sqrt({_pf(C)} - {_pf(2.0 * n)} * "
        f"sin(radians({lat}))))"
    )
    theta = f"({_pf(n)} * radians({_dlon_sql(lon, lon0)}))"
    x = f"({rho} * sin({theta}) + {_pf(x0)})"
    y = f"({_pf(rho0 + y0)} - {rho} * cos({theta}))"
    return x, y


def aea_inv_sql(p: dict, x: str = "x", y: str = "y") -> tuple[str, str]:
    """Inverse Albers equal-area conic (sphere), Snyder 14-8..14-11:
    phi = asin((C - (rho n / R)^2) / (2 n)) — rho^2 used directly, no
    sqrt round-trip."""
    n, C, rho0, _ = _aea_constants(p)
    R = float(p.get("R", p.get("a", R_SPHERE)))
    lon0 = float(p.get("lon_0", 0.0))
    x0, y0 = float(p.get("x_0", 0.0)), float(p.get("y_0", 0.0))
    s = 1.0 if n >= 0 else -1.0
    xp = f"(({x}) - {_pf(x0)})"
    yp = f"({_pf(rho0)} - (({y}) - {_pf(y0)}))"
    rho2 = f"({xp} * {xp} + {yp} * {yp})"
    theta = f"atan2({_pf(s)} * {xp}, {_pf(s)} * {yp})"
    # clamp like the ellipsoidal twin (crs.py _aea_ell_inv_sql): points
    # at/inside the pole circle otherwise asin(>1) -> NaN in BOTH engines
    # (oracle-invisible; r4 review finding)
    sinphi = f"(({_pf(C)} - {_pf((n / R) ** 2)} * {rho2}) / {_pf(2.0 * n)})"
    glat = f"degrees(asin(least(greatest({sinphi}, -1.0E0), 1.0E0)))"
    glon = _wrap_out_sql(f"degrees({theta}) / {_pf(n)} + {_pf(lon0)}")
    return glon, glat


def _stere_constants(p: dict) -> tuple[float, float, float]:
    """(sgn, 2 R k0, R) for a polar-stereographic parameter dict. k0
    derives from lat_ts when present — true scale at the standard
    parallel: k0 = (1 + sin|lat_ts|)/2 (Snyder 21-7 with k0 chosen so
    k(lat_ts) = 1); CFPolarStereographic defaults scale_factor to 1.0
    when neither is given (reference crs.py:1108-1113)."""
    lat0 = float(p.get("lat_0", 90.0))
    if abs(abs(lat0) - 90.0) > 1e-9:
        raise ValueError(
            f"stere: only the polar aspects are supported (lat_0 = ±90, "
            f"got {lat0}) — the CF grid mapping is polar_stereographic"
        )
    sgn = 1.0 if lat0 > 0 else -1.0
    R = float(p.get("R", p.get("a", R_SPHERE)))
    if p.get("lat_ts") is not None:
        k0 = (1.0 + math.sin(math.radians(abs(float(p["lat_ts"]))))) / 2.0
    else:
        k0 = float(p.get("k_0", 1.0))
    return sgn, 2.0 * R * k0, R


def stere_sql(p: dict, lon: str = "lon", lat: str = "lat") -> tuple[str, str]:
    """Forward polar stereographic (sphere), Snyder 21-7..21-12:
    rho = 2 R k0 tan(pi/4 - sgn·phi/2); x = rho sin(dl),
    y = -sgn · rho cos(dl) (north: y decreases away from the pole)."""
    sgn, RK2, _ = _stere_constants(p)
    lon0 = float(p.get("lon_0", 0.0))
    x0, y0 = float(p.get("x_0", 0.0)), float(p.get("y_0", 0.0))
    rho = (
        f"({_pf(RK2)} * tan(pi() / 4.0E0 - {_pf(sgn)} * radians({lat}) "
        f"/ 2.0E0))"
    )
    dl = f"radians({_dlon_sql(lon, lon0)})"
    x = f"({rho} * sin({dl}) + {_pf(x0)})"
    y = f"({_pf(-sgn)} * {rho} * cos({dl}) + {_pf(y0)})"
    return x, y


def stere_inv_sql(p: dict, x: str = "x", y: str = "y") -> tuple[str, str]:
    """Inverse polar stereographic (sphere), Snyder 21-14..21-15:
    phi = sgn (pi/2 - 2 atan(rho / 2 R k0)); lambda = lambda0 +
    atan2(x', -sgn y')."""
    sgn, RK2, _ = _stere_constants(p)
    lon0 = float(p.get("lon_0", 0.0))
    x0, y0 = float(p.get("x_0", 0.0)), float(p.get("y_0", 0.0))
    xp = f"(({x}) - {_pf(x0)})"
    yp = f"(({y}) - {_pf(y0)})"
    rho = f"sqrt({xp} * {xp} + {yp} * {yp})"
    glat = (
        f"({_pf(sgn)} * degrees(pi() / 2.0E0 - 2.0E0 * "
        f"atan({rho} / {_pf(RK2)})))"
    )
    glon = _wrap_out_sql(f"degrees(atan2({xp}, {_pf(-sgn)} * {yp})) + {_pf(lon0)}")
    return glon, glat


# ---- ellipsoidal datum support --------------------------------------
# The reference defaults every CF CRS to its Spherical datum
# (crs.py:803) but honors file-declared ellipsoids through PROJ
# (crs.py:888-1030: semi_major_axis / inverse_flattening attrs land in
# the proj4 dict). The closed forms below are Snyder (1987) ellipsoidal
# eqs; inverses use the conformal/authalic latitude SERIES (Snyder 3-5 /
# 3-18) instead of PROJ's fixed-point iteration so the SAME dialect-
# neutral SQL string backs Catalyst and the DuckDB oracle — series
# truncation error is O(e^10) rad (conformal) / O(e^8) rad (authalic),
# sub-millimeter for every geodetic ellipsoid.

#: ellps/datum name -> (semi-major axis a, inverse flattening rf | None,
#: semi-minor axis b when rf is None)
_ELLPS = {
    "WGS84": (6378137.0, 298.257223563, None),
    "GRS80": (6378137.0, 298.257222101, None),
    "WGS72": (6378135.0, 298.26, None),
    "clrk66": (6378206.4, None, 6356583.8),
    "intl": (6378388.0, 297.0, None),
}


def ellipsoid_of(p: dict):
    """(a, e2) when the parameter dict declares an ellipsoid, else None
    (spherical path). Accepts PROJ-style ``a``/``b``/``rf``/``es`` keys,
    CF-style ``semi_major_axis``/``semi_minor_axis``/
    ``inverse_flattening``, or an ``ellps``/``datum`` name. ``R`` /
    ``earth_radius`` forces the sphere; a bare ``a`` with no flattening
    is a sphere of radius a (PROJ semantics)."""
    if p.get("R") is not None or p.get("earth_radius") is not None:
        return None
    a = p.get("a", p.get("semi_major_axis"))
    b = p.get("b", p.get("semi_minor_axis"))
    rf = p.get("rf", p.get("inverse_flattening"))
    es = p.get("es")
    name = p.get("ellps", p.get("datum"))
    if name is not None and name != "sphere":
        # PROJ semantics: an explicit a/b/rf/es key overrides the SAME
        # field of the named ellipsoid, the rest is kept — a bare 'a'
        # next to 'ellps' resizes the ellipsoid, it does not flatten it
        try:
            na, nrf, nb = _ELLPS[name]
        except KeyError:
            raise NotImplementedError(
                f"unknown ellps/datum {name!r} (known: {sorted(_ELLPS)})"
            )
        a = na if a is None else a
        if rf is None and b is None and es is None:
            rf, b = nrf, nb
    if a is None:
        return None
    a = float(a)
    if es is not None:
        e2 = float(es)
    elif rf not in (None, 0, 0.0):
        fl = 1.0 / float(rf)
        e2 = fl * (2.0 - fl)
    elif b is not None:
        e2 = 1.0 - (float(b) / a) ** 2
    else:
        return None
    if e2 <= 0.0:
        return None
    return a, e2


def _t_of(phi: float, e: float) -> float:
    """Snyder 15-9: the conformal-latitude half-angle ratio t(phi)."""
    s = e * math.sin(phi)
    return math.tan(math.pi / 4.0 - phi / 2.0) / (
        (1.0 - s) / (1.0 + s)
    ) ** (e / 2.0)


def _m_of(phi: float, e2: float) -> float:
    """Snyder 14-15: m(phi) = cos(phi)/sqrt(1 - e2 sin^2 phi)."""
    s = math.sin(phi)
    return math.cos(phi) / math.sqrt(1.0 - e2 * s * s)


def _q_of(phi: float, e: float, e2: float) -> float:
    """Snyder 3-12: the equal-area auxiliary q(phi)."""
    s = math.sin(phi)
    return (1.0 - e2) * (
        s / (1.0 - e2 * s * s)
        - (1.0 / (2.0 * e)) * math.log((1.0 - e * s) / (1.0 + e * s))
    )


def _t_sql(phirad: str, e: float) -> str:
    """t(phi) as dialect-neutral SQL over a radians expression."""
    s = f"({_pf(e)} * sin({phirad}))"
    return (
        f"(tan(pi() / 4.0E0 - ({phirad}) / 2.0E0) / "
        f"power((1.0E0 - {s}) / (1.0E0 + {s}), {_pf(e / 2.0)}))"
    )


def _q_sql(phirad: str, e: float, e2: float) -> str:
    """q(phi) as dialect-neutral SQL over a radians expression."""
    s = f"sin({phirad})"
    return (
        f"({_pf(1.0 - e2)} * ({s} / (1.0E0 - {_pf(e2)} * {s} * {s}) - "
        f"{_pf(1.0 / (2.0 * e))} * ln((1.0E0 - {_pf(e)} * {s}) / "
        f"(1.0E0 + {_pf(e)} * {s}))))"
    )


def _conf_phi_sql(chi: str, e2: float) -> str:
    """phi from the conformal latitude chi, Snyder 3-5 series (through
    e^8; next term O(e^10) ~ 1e-12 rad for WGS84)."""
    e4, e6, e8 = e2 * e2, e2 ** 3, e2 ** 4
    A = e2 / 2.0 + 5.0 * e4 / 24.0 + e6 / 12.0 + 13.0 * e8 / 360.0
    B = 7.0 * e4 / 48.0 + 29.0 * e6 / 240.0 + 811.0 * e8 / 11520.0
    C = 7.0 * e6 / 120.0 + 81.0 * e8 / 1120.0
    D = 4279.0 * e8 / 161280.0
    return (
        f"(({chi}) + {_pf(A)} * sin(2.0E0 * ({chi})) "
        f"+ {_pf(B)} * sin(4.0E0 * ({chi})) "
        f"+ {_pf(C)} * sin(6.0E0 * ({chi})) "
        f"+ {_pf(D)} * sin(8.0E0 * ({chi})))"
    )


def _auth_phi_sql(beta: str, e2: float) -> str:
    """phi from the authalic latitude beta, Snyder 3-18 series (through
    e^6; next term O(e^8) ~ 3e-10 rad for WGS84)."""
    e4, e6 = e2 * e2, e2 ** 3
    A = e2 / 3.0 + 31.0 * e4 / 180.0 + 517.0 * e6 / 5040.0
    B = 23.0 * e4 / 360.0 + 251.0 * e6 / 3780.0
    C = 761.0 * e6 / 45360.0
    return (
        f"(({beta}) + {_pf(A)} * sin(2.0E0 * ({beta})) "
        f"+ {_pf(B)} * sin(4.0E0 * ({beta})) "
        f"+ {_pf(C)} * sin(6.0E0 * ({beta})))"
    )


def _lcc_ell_constants(p: dict, a: float, e2: float):
    """(n, a*F, rho0) for the ellipsoidal Lambert conformal conic
    (Snyder 15-7/15-8/15-10)."""
    e = math.sqrt(e2)
    lat1 = math.radians(float(p["lat_1"]))
    lat2 = math.radians(float(p.get("lat_2", p["lat_1"])))
    lat0 = math.radians(float(p.get("lat_0", 0.0)))
    t1, t2, t0 = _t_of(lat1, e), _t_of(lat2, e), _t_of(lat0, e)
    m1, m2 = _m_of(lat1, e2), _m_of(lat2, e2)
    if abs(lat1 - lat2) < 1e-12:
        n = math.sin(lat1)
    else:
        n = (math.log(m1) - math.log(m2)) / (math.log(t1) - math.log(t2))
    if abs(n) < 1e-12:
        raise ValueError("lcc: standard parallels symmetric about the "
                         "equator degenerate (n = 0); use mercator")
    aF = a * m1 / (n * t1 ** n)
    rho0 = aF * t0 ** n
    return n, aF, rho0


def _lcc_ell_sql(p: dict, lon: str, lat: str) -> tuple[str, str]:
    """Forward ellipsoidal LCC, Snyder 15-1/15-2 with rho = a F t^n."""
    a, e2 = ellipsoid_of(p)
    n, aF, rho0 = _lcc_ell_constants(p, a, e2)
    lon0 = float(p.get("lon_0", 0.0))
    x0, y0 = float(p.get("x_0", 0.0)), float(p.get("y_0", 0.0))
    t = _t_sql(f"radians({lat})", math.sqrt(e2))
    rho = f"({_pf(aF)} * power({t}, {_pf(n)}))"
    theta = f"({_pf(n)} * radians({_dlon_sql(lon, lon0)}))"
    x = f"({rho} * sin({theta}) + {_pf(x0)})"
    y = f"({_pf(rho0 + y0)} - {rho} * cos({theta}))"
    return x, y


def _lcc_ell_inv_sql(p: dict, x: str, y: str) -> tuple[str, str]:
    """Inverse ellipsoidal LCC: t = (rho/(aF))^(1/n), chi = pi/2 -
    2 atan(t), phi = conformal series (Snyder 15-11 + 3-5)."""
    a, e2 = ellipsoid_of(p)
    n, aF, rho0 = _lcc_ell_constants(p, a, e2)
    lon0 = float(p.get("lon_0", 0.0))
    x0, y0 = float(p.get("x_0", 0.0)), float(p.get("y_0", 0.0))
    s = 1.0 if n >= 0 else -1.0
    xp = f"(({x}) - {_pf(x0)})"
    yp = f"({_pf(rho0)} - (({y}) - {_pf(y0)}))"
    rho = f"({_pf(s)} * sqrt({xp} * {xp} + {yp} * {yp}))"
    theta = f"atan2({_pf(s)} * {xp}, {_pf(s)} * {yp})"
    t = f"power({rho} / {_pf(aF)}, {_pf(1.0 / n)})"
    chi = f"(pi() / 2.0E0 - 2.0E0 * atan({t}))"
    glat = f"degrees({_conf_phi_sql(chi, e2)})"
    glon = _wrap_out_sql(f"degrees({theta}) / {_pf(n)} + {_pf(lon0)}")
    return glon, glat


def _aea_ell_constants(p: dict, a: float, e2: float):
    """(n, C, rho0, qp) for the ellipsoidal Albers equal-area conic
    (Snyder 14-13/14-14)."""
    e = math.sqrt(e2)
    lat1 = math.radians(float(p["lat_1"]))
    lat2 = math.radians(float(p.get("lat_2", p["lat_1"])))
    lat0 = math.radians(float(p.get("lat_0", 0.0)))
    m1, m2 = _m_of(lat1, e2), _m_of(lat2, e2)
    q1, q2 = _q_of(lat1, e, e2), _q_of(lat2, e, e2)
    q0 = _q_of(lat0, e, e2)
    if abs(lat1 - lat2) < 1e-12:
        n = math.sin(lat1)
    else:
        n = (m1 * m1 - m2 * m2) / (q2 - q1)
    if abs(n) < 1e-12:
        raise ValueError("aea: standard parallels symmetric about the "
                         "equator degenerate (n = 0)")
    C = m1 * m1 + n * q1
    rho0 = a * math.sqrt(C - n * q0) / n
    qp = _q_of(math.pi / 2.0, e, e2)
    return n, C, rho0, qp


def _aea_ell_sql(p: dict, lon: str, lat: str) -> tuple[str, str]:
    """Forward ellipsoidal Albers, Snyder 14-1..14-4 with
    rho = (a/n) sqrt(C - n q)."""
    a, e2 = ellipsoid_of(p)
    n, C, rho0, _ = _aea_ell_constants(p, a, e2)
    lon0 = float(p.get("lon_0", 0.0))
    x0, y0 = float(p.get("x_0", 0.0)), float(p.get("y_0", 0.0))
    q = _q_sql(f"radians({lat})", math.sqrt(e2), e2)
    rho = f"({_pf(a / n)} * sqrt({_pf(C)} - {_pf(n)} * {q}))"
    theta = f"({_pf(n)} * radians({_dlon_sql(lon, lon0)}))"
    x = f"({rho} * sin({theta}) + {_pf(x0)})"
    y = f"({_pf(rho0 + y0)} - {rho} * cos({theta}))"
    return x, y


def _aea_ell_inv_sql(p: dict, x: str, y: str) -> tuple[str, str]:
    """Inverse ellipsoidal Albers: q = (C - (rho n / a)^2)/n, beta =
    asin(q/qp), phi = authalic series (Snyder 14-19 + 3-18). The asin
    argument is clamped — rounding can push |q/qp| past 1 at the
    pole."""
    a, e2 = ellipsoid_of(p)
    n, C, rho0, qp = _aea_ell_constants(p, a, e2)
    lon0 = float(p.get("lon_0", 0.0))
    x0, y0 = float(p.get("x_0", 0.0)), float(p.get("y_0", 0.0))
    s = 1.0 if n >= 0 else -1.0
    xp = f"(({x}) - {_pf(x0)})"
    yp = f"({_pf(rho0)} - (({y}) - {_pf(y0)}))"
    rho2 = f"({xp} * {xp} + {yp} * {yp})"
    theta = f"atan2({_pf(s)} * {xp}, {_pf(s)} * {yp})"
    q = f"(({_pf(C)} - {_pf((n / a) ** 2)} * {rho2}) / {_pf(n)})"
    beta = (
        f"asin(least(greatest({q} / {_pf(qp)}, -1.0E0), 1.0E0))"
    )
    glat = f"degrees({_auth_phi_sql(beta, e2)})"
    glon = _wrap_out_sql(f"degrees({theta}) / {_pf(n)} + {_pf(lon0)}")
    return glon, glat


def _stere_ell_coef(p: dict, a: float, e2: float) -> tuple[float, float]:
    """(sgn, coef) with rho = coef * t(sgn*phi) for the ellipsoidal
    polar stereographic: lat_ts form Snyder 21-34 (a m(ts)/t(ts)), k0
    form Snyder 21-33 (2 a k0 / sqrt((1+e)^(1+e) (1-e)^(1-e)))."""
    e = math.sqrt(e2)
    lat0 = float(p.get("lat_0", 90.0))
    if abs(abs(lat0) - 90.0) > 1e-9:
        raise ValueError(
            f"stere: only the polar aspects are supported (lat_0 = ±90, "
            f"got {lat0}) — the CF grid mapping is polar_stereographic"
        )
    sgn = 1.0 if lat0 > 0 else -1.0
    if p.get("lat_ts") is not None:
        ts = math.radians(abs(float(p["lat_ts"])))
        coef = a * _m_of(ts, e2) / _t_of(ts, e)
    else:
        k0 = float(p.get("k_0", 1.0))
        coef = (
            2.0 * a * k0
            / math.sqrt((1.0 + e) ** (1.0 + e) * (1.0 - e) ** (1.0 - e))
        )
    return sgn, coef


def _stere_ell_sql(p: dict, lon: str, lat: str) -> tuple[str, str]:
    """Forward ellipsoidal polar stereographic, Snyder 21-30..21-34."""
    a, e2 = ellipsoid_of(p)
    sgn, coef = _stere_ell_coef(p, a, e2)
    lon0 = float(p.get("lon_0", 0.0))
    x0, y0 = float(p.get("x_0", 0.0)), float(p.get("y_0", 0.0))
    t = _t_sql(f"({_pf(sgn)} * radians({lat}))", math.sqrt(e2))
    rho = f"({_pf(coef)} * {t})"
    dl = f"radians({_dlon_sql(lon, lon0)})"
    x = f"({rho} * sin({dl}) + {_pf(x0)})"
    y = f"({_pf(-sgn)} * {rho} * cos({dl}) + {_pf(y0)})"
    return x, y


def _stere_ell_inv_sql(p: dict, x: str, y: str) -> tuple[str, str]:
    """Inverse ellipsoidal polar stereographic: t = rho/coef, chi =
    pi/2 - 2 atan(t), phi = sgn * conformal series (Snyder 21-39 +
    3-5)."""
    a, e2 = ellipsoid_of(p)
    sgn, coef = _stere_ell_coef(p, a, e2)
    lon0 = float(p.get("lon_0", 0.0))
    x0, y0 = float(p.get("x_0", 0.0)), float(p.get("y_0", 0.0))
    xp = f"(({x}) - {_pf(x0)})"
    yp = f"(({y}) - {_pf(y0)})"
    t = f"(sqrt({xp} * {xp} + {yp} * {yp}) / {_pf(coef)})"
    chi = f"(pi() / 2.0E0 - 2.0E0 * atan({t}))"
    glat = f"({_pf(sgn)} * degrees({_conf_phi_sql(chi, e2)}))"
    glon = _wrap_out_sql(
        f"degrees(atan2({xp}, {_pf(-sgn)} * {yp})) + {_pf(lon0)}"
    )
    return glon, glat


def _dispatch_ell(fwd_sph, fwd_ell, inv_sph, inv_ell):
    """Wrap a (forward, inverse) emitter pair to route to the
    ellipsoidal twins when the parameter dict declares a datum. The
    spherical strings are byte-identical to the undispatched emitters
    (existing oracles unchanged)."""

    def fwd(p, lon="lon", lat="lat"):
        if ellipsoid_of(p) is not None:
            return fwd_ell(p, lon, lat)
        return fwd_sph(p, lon=lon, lat=lat)

    def inv(p, x="x", y="y"):
        if ellipsoid_of(p) is not None:
            return inv_ell(p, x, y)
        return inv_sph(p, x=x, y=y)

    return fwd, inv


#: proj name -> (forward emitter lon/lat->x/y, inverse emitter x/y->lon/lat)
_PARAM_PROJS = {
    "lcc": _dispatch_ell(lcc_sql, _lcc_ell_sql, lcc_inv_sql, _lcc_ell_inv_sql),
    "aea": _dispatch_ell(aea_sql, _aea_ell_sql, aea_inv_sql, _aea_ell_inv_sql),
    "stere": _dispatch_ell(
        stere_sql, _stere_ell_sql, stere_inv_sql, _stere_ell_inv_sql
    ),
}


def _is_geographic(crs) -> bool:
    """Geographic lon/lat systems, including the reference's `Tripole`
    tag (/root/reference/src/ocgis/variable/crs.py:836-850): a spherical
    lon/lat system whose three grid poles are a TOPOLOGY property, not a
    coordinate transform — the reference transforms Tripole<->Spherical/
    Cartesian through the same spherical math, so coordinate-wise it IS
    geographic and composes identically here (`{'proj': 'tripole'}`)."""
    if isinstance(crs, dict):
        return crs.get("proj") in ("longlat", "latlong", "tripole")
    return _norm_crs(crs) == "EPSG:4326"


def is_tripole(crs) -> bool:
    """True for the tripole marker dict — consumers that care about the
    three grid singularities (seam handling, regrid weights near the
    poles) can branch on the tag; everything coordinate-level treats it
    as geographic."""
    return isinstance(crs, dict) and crs.get("proj") == "tripole"


def transform_param_crs(
    df: DataFrame,
    params: dict,
    lon: str = "lon",
    lat: str = "lat",
    out_x: str = "x",
    out_y: str = "y",
    inverse: bool = False,
) -> DataFrame:
    """Apply one parametric conic/polar projection (or its inverse) as
    native Catalyst columns. ``params`` is a PROJ-style dict, e.g.
    ``{'proj': 'lcc', 'lat_1': 30, 'lat_2': 60, 'lat_0': 47.5,
    'lon_0': -97, 'x_0': 0, 'y_0': 0}``."""
    proj = params.get("proj")
    if proj not in _PARAM_PROJS:
        raise NotImplementedError(
            f"parametric proj {proj!r} not supported (native: "
            f"{sorted(_PARAM_PROJS)})"
        )
    fwd, inv = _PARAM_PROJS[proj]
    if inverse:
        ex, ey = inv(params, x=lon, y=lat)
    else:
        ex, ey = fwd(params, lon=lon, lat=lat)
    return df.withColumn(out_x, F.expr(ex)).withColumn(out_y, F.expr(ey))


def _omerc_constants(p: dict) -> tuple[float, float, float, float]:
    """(sin(phi_p), cos(phi_p), lon0, R·k0) for an oblique-Mercator
    parameter dict given as central point + azimuth (Snyder 9-7/9-8:
    the oblique pole from a central line through (lat_0, lonc) with
    azimuth alpha; lambda0 = lambda_p + pi/2). The reference's
    CFNarccapObliqueMercator (crs.py:1117-1130) carries exactly these
    CF attrs, defaulting alpha to 360 (≡ the transverse aspect — its
    grid_mapping_name is 'transverse_mercator')."""
    if ellipsoid_of(p) is not None:
        raise NotImplementedError(
            "omerc: this emitter is spherical only — ellipsoidal Hotine "
            "is native via _omerc_ell_sql (the _PARAM_PROJS dispatch "
            "routes datum-declaring dicts there automatically)"
        )
    phic = math.radians(float(p.get("lat_0", 0.0)))
    lamc = math.radians(float(p.get("lonc", p.get("lon_0", 0.0))))
    beta = math.radians(float(p.get("alpha", 360.0)))
    R = float(p.get("R", p.get("a", R_SPHERE)))
    k0 = float(p.get("k_0", 1.0))
    phip = math.asin(math.cos(phic) * math.sin(beta))
    lamp = math.atan2(
        -math.cos(beta), -math.sin(phic) * math.sin(beta)
    ) + lamc
    lam0 = lamp + math.pi / 2.0
    # normalize into (-pi, pi]
    lam0 = (lam0 + math.pi) % (2.0 * math.pi) - math.pi
    return math.sin(phip), math.cos(phip), math.degrees(lam0), R * k0


def omerc_sql(p: dict, lon: str = "lon", lat: str = "lat") -> tuple[str, str]:
    """Forward spherical oblique Mercator, Snyder 9-3/9-4 (unrotated
    u,v axes — see FIDELITY.md on the PROJ 'omerc' grid-rotation
    convention): with A = sin(phi_p) sin(phi) - cos(phi_p) cos(phi)
    sin(dl), x = R k0 atan2(tan(phi) cos(phi_p) + sin(phi_p) sin(dl),
    cos(dl)), y = R k0 atanh(A) (atanh via ln — no tanh dependency in
    either dialect)."""
    sp, cp, lon0, RK = _omerc_constants(p)
    x0, y0 = float(p.get("x_0", 0.0)), float(p.get("y_0", 0.0))
    dl = f"radians({_dlon_sql(lon, lon0)})"
    phi = f"radians({lat})"
    A = (
        f"({_pf(sp)} * sin({phi}) - {_pf(cp)} * cos({phi}) * sin({dl}))"
    )
    x = (
        f"({_pf(RK)} * atan2(tan({phi}) * {_pf(cp)} + {_pf(sp)} * "
        f"sin({dl}), cos({dl})) + {_pf(x0)})"
    )
    y = (
        f"({_pf(RK)} * 0.5E0 * ln((1.0E0 + {A}) / (1.0E0 - {A})) "
        f"+ {_pf(y0)})"
    )
    return x, y


def omerc_inv_sql(p: dict, x: str = "x", y: str = "y") -> tuple[str, str]:
    """Inverse spherical oblique Mercator, Snyder 9-9/9-10 (hyperbolics
    expanded to exp so the string is dialect-neutral):
    phi = asin(sin(phi_p) tanh(v) + cos(phi_p) sin(u) / cosh(v)),
    lambda = lambda0 + atan2(sin(phi_p) sin(u) - cos(phi_p) sinh(v),
    cos(u)) with u = (x-x0)/(R k0), v = (y-y0)/(R k0)."""
    sp, cp, lon0, RK = _omerc_constants(p)
    x0, y0 = float(p.get("x_0", 0.0)), float(p.get("y_0", 0.0))
    u = f"((({x}) - {_pf(x0)}) / {_pf(RK)})"
    v = f"((({y}) - {_pf(y0)}) / {_pf(RK)})"
    ev = f"exp({v})"
    env = f"exp(0.0E0 - {v})"
    sinh_v = f"(({ev} - {env}) / 2.0E0)"
    cosh_v = f"(({ev} + {env}) / 2.0E0)"
    tanh_v = f"(({ev} - {env}) / ({ev} + {env}))"
    sinphi = (
        f"({_pf(sp)} * {tanh_v} + {_pf(cp)} * sin({u}) / {cosh_v})"
    )
    # |tanh|<1 and |sin/cosh|<1 keep the sum inside (-sp-cp, sp+cp), but
    # float rounding can still graze past 1 near the oblique pole — clamp
    # (r4 review finding)
    glat = f"degrees(asin(least(greatest({sinphi}, -1.0E0), 1.0E0)))"
    glon = _wrap_out_sql(
        f"degrees(atan2({_pf(sp)} * sin({u}) - {_pf(cp)} * {sinh_v}, "
        f"cos({u}))) + {_pf(lon0)}"
    )
    return glon, glat


def _omerc_ell_constants(p: dict):
    """Hotine oblique Mercator constants, Snyder (1987) eqs 9-11..9-24
    (Alternate B: central point lat_0/lonc + azimuth alpha), matching
    the reference's CFNarccapObliqueMercator when the file declares a
    datum (/root/reference/src/ocgis/variable/crs.py:1117 routes the
    same CF attrs through PROJ +proj=omerc). Returns
    (B, A, E, sin(gamma0), cos(gamma0), lam0_deg, e2, x_0, y_0)."""
    a, e2 = ellipsoid_of(p)
    e = math.sqrt(e2)
    phi0 = math.radians(float(p.get("lat_0", 0.0)))
    lamc = math.radians(float(p.get("lonc", p.get("lon_0", 0.0))))
    alpha = math.radians(float(p.get("alpha", 360.0)))
    k0 = float(p.get("k_0", 1.0))
    c0, s0 = math.cos(phi0), math.sin(phi0)
    Bc = math.sqrt(1.0 + e2 * c0 ** 4 / (1.0 - e2))
    Ac = a * Bc * k0 * math.sqrt(1.0 - e2) / (1.0 - e2 * s0 * s0)
    t0 = _t_of(phi0, e)
    D = Bc * math.sqrt(1.0 - e2) / (c0 * math.sqrt(1.0 - e2 * s0 * s0))
    D2 = max(D * D, 1.0)
    Fc = D + math.copysign(math.sqrt(D2 - 1.0), phi0 if phi0 else 1.0)
    Ec = Fc * t0 ** Bc
    G = (Fc - 1.0 / Fc) / 2.0
    sg = math.sin(alpha) / D
    gamma0 = math.asin(max(-1.0, min(1.0, sg)))
    lam0 = lamc - math.asin(
        max(-1.0, min(1.0, G * math.tan(gamma0)))
    ) / Bc
    lam0 = (lam0 + math.pi) % (2.0 * math.pi) - math.pi
    return (
        Bc, Ac, Ec, math.sin(gamma0), math.cos(gamma0),
        math.degrees(lam0), e2,
        float(p.get("x_0", 0.0)), float(p.get("y_0", 0.0)),
    )


def _omerc_ell_sql(p: dict, lon: str, lat: str) -> tuple[str, str]:
    """Forward ellipsoidal Hotine oblique Mercator, Snyder 9-25..9-34
    (unrotated u,v axes like the spherical emitter): Q = E/t^B,
    S = (Q-1/Q)/2, T = (Q+1/Q)/2, V = sin(B dl),
    U = (S sin(g0) - V cos(g0))/T, u = (A/B) atan2(S cos(g0) +
    V sin(g0), cos(B dl)), v = (A/2B) ln((1+U)/(1-U)). The v sign is
    FLIPPED vs Snyder's printed 9-25 so that e -> 0 converges to this
    repo's spherical omerc axis convention (FIDELITY.md; verified by
    the e-continuation test in tests/test_transform_crs.py: the
    residual vs the spherical path shrinks as O(e^2))."""
    Bc, Ac, Ec, sg, cg, lam0, e2, x0, y0 = _omerc_ell_constants(p)
    e = math.sqrt(e2)
    dl = f"({_pf(Bc)} * radians({_dlon_sql(lon, lam0)}))"
    t = _t_sql(f"radians({lat})", e)
    Q = f"({_pf(Ec)} / power({t}, {_pf(Bc)}))"
    S = f"(({Q} - 1.0E0 / {Q}) / 2.0E0)"
    T = f"(({Q} + 1.0E0 / {Q}) / 2.0E0)"
    V = f"sin({dl})"
    U = f"(({S} * {_pf(sg)} - {V} * {_pf(cg)}) / {T})"
    # |U| < 1 analytically; clamp one ulp shy of 1 so ln never sees 0/inf
    Ucl = f"least(greatest({U}, -0.999999999999999E0), 0.999999999999999E0)"
    x = (
        f"({_pf(Ac / Bc)} * atan2({S} * {_pf(cg)} + {V} * {_pf(sg)}, "
        f"cos({dl})) + {_pf(x0)})"
    )
    y = (
        f"({_pf(Ac / (2.0 * Bc))} * ln((1.0E0 + {Ucl}) / "
        f"(1.0E0 - {Ucl})) + {_pf(y0)})"
    )
    return x, y


def _omerc_ell_inv_sql(p: dict, x: str, y: str) -> tuple[str, str]:
    """Inverse ellipsoidal Hotine, Snyder 9-42..9-47 under the same
    axis convention as the forward: with vq = B(y-y0)/A, uq = B(x-x0)/A,
    Q' = exp(vq), S' = sinh(vq), T' = cosh(vq), V' = sin(uq),
    U' = (V' cos(g0) + S' sin(g0))/T',
    t = (E sqrt((1-U')/(1+U')))^(1/B), chi = pi/2 - 2 atan(t), phi via
    the conformal series (Snyder 3-5), lambda = lam0 +
    atan2(S'... sign from the spherical limit) / B."""
    Bc, Ac, Ec, sg, cg, lam0, e2, x0, y0 = _omerc_ell_constants(p)
    vq = f"({_pf(Bc / Ac)} * (({y}) - {_pf(y0)}))"
    uq = f"({_pf(Bc / Ac)} * (({x}) - {_pf(x0)}))"
    ev = f"exp({vq})"
    env = f"exp(0.0E0 - {vq})"
    Sp = f"(({ev} - {env}) / 2.0E0)"
    Tp = f"(({ev} + {env}) / 2.0E0)"
    Vp = f"sin({uq})"
    Up = f"(({Vp} * {_pf(cg)} + {Sp} * {_pf(sg)}) / {Tp})"
    Upc = f"least(greatest({Up}, -0.999999999999999E0), 0.999999999999999E0)"
    t = (
        f"power({_pf(Ec)} * sqrt((1.0E0 - {Upc}) / (1.0E0 + {Upc})), "
        f"{_pf(1.0 / Bc)})"
    )
    chi = f"(pi() / 2.0E0 - 2.0E0 * atan({t}))"
    glat = f"degrees({_conf_phi_sql(chi, e2)})"
    glon = _wrap_out_sql(
        f"degrees(atan2({_pf(sg)} * {Vp} - {_pf(cg)} * {Sp}, "
        f"cos({uq}))) / {_pf(Bc)} + {_pf(lam0)}"
    )
    return glon, glat


_PARAM_PROJS["omerc"] = _dispatch_ell(
    omerc_sql, _omerc_ell_sql, omerc_inv_sql, _omerc_ell_inv_sql
)


def haversine_m_sql(lon1: str, lat1: str, lon2: str, lat2: str,
                    R: float = R_SPHERE) -> str:
    """Great-circle distance in METERS as ONE dialect-shared SQL string
    (Spark `F.expr` and DuckDB parse the identical expression tree, so
    only libm rounding can differ — consumers compare on round(·, 3),
    millimeters, with libm drift around 1e-9 relative). Sphere radius
    defaults to the reference's `Spherical` 6370997 m
    (src/ocgis/variable/crs.py:803). The half-angle sines are SQUARED,
    which makes the formula longitude-wrap-safe: Δλ and Δλ±360° give the
    same sin² term, so callers never pre-normalize longitudes."""
    s1 = f"sin(radians(({lat2}) - ({lat1})) / 2.0E0)"
    s2 = f"sin(radians(({lon2}) - ({lon1})) / 2.0E0)"
    h = (f"(({s1}) * ({s1})) + cos(radians({lat1})) * "
         f"cos(radians({lat2})) * (({s2}) * ({s2}))")
    # clamp: antipodal pairs can push h one ulp past 1.0 -> asin NaN
    return f"2.0E0 * {_pf(R)} * asin(sqrt(least(1.0E0, {h})))"
