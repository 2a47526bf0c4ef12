"""Minimal WKB (well-known binary) codec for Point / Polygon / MultiPolygon.

Geometries travel through DataFrames as ``binary`` WKB columns (the Spark
mapping of ocgis's object-dtype ``GeometryVariable``,
reference ``src/ocgis/variable/geom.py:188``). Only the subset of WKB the
engine needs is implemented: 2-D Point (1), Polygon (3), MultiPolygon (6),
little-endian.

A polygon is represented in Python as a list of rings; each ring is an
``(N, 2)`` float64 ndarray of (x, y) with the closing vertex repeated.
"""

from __future__ import annotations

import struct

import numpy as np

_LE = 1
WKB_POINT = 1
WKB_POLYGON = 3
WKB_MULTIPOLYGON = 6


def point_to_wkb(x: float, y: float) -> bytes:
    return struct.pack("<BIdd", _LE, WKB_POINT, float(x), float(y))


def _ring_to_wkb(ring: np.ndarray) -> bytes:
    ring = np.asarray(ring, dtype="<f8")
    if not (ring[0] == ring[-1]).all():
        ring = np.vstack([ring, ring[:1]])
    return struct.pack("<I", len(ring)) + ring.tobytes()


def polygon_to_wkb(rings: list[np.ndarray]) -> bytes:
    body = struct.pack("<BII", _LE, WKB_POLYGON, len(rings))
    return body + b"".join(_ring_to_wkb(r) for r in rings)


def box_to_wkb(minx: float, miny: float, maxx: float, maxy: float) -> bytes:
    ring = np.array(
        [[minx, miny], [maxx, miny], [maxx, maxy], [minx, maxy], [minx, miny]],
        dtype="<f8",
    )
    return polygon_to_wkb([ring])


def multipolygon_to_wkb(polygons: list[list[np.ndarray]]) -> bytes:
    body = struct.pack("<BII", _LE, WKB_MULTIPOLYGON, len(polygons))
    return body + b"".join(polygon_to_wkb(p) for p in polygons)


def _read_ring(buf: bytes, off: int) -> tuple[np.ndarray, int]:
    (n,) = struct.unpack_from("<I", buf, off)
    off += 4
    ring = np.frombuffer(buf, dtype="<f8", count=2 * n, offset=off).reshape(n, 2)
    return ring, off + 16 * n


def _read_polygon_body(buf: bytes, off: int) -> tuple[list[np.ndarray], int]:
    (nrings,) = struct.unpack_from("<I", buf, off)
    off += 4
    rings = []
    for _ in range(nrings):
        ring, off = _read_ring(buf, off)
        rings.append(ring)
    return rings, off


def parse_wkb(buf: bytes):
    """Return ``("point", (x, y))`` / ``("polygon", [rings])`` /
    ``("multipolygon", [[rings], ...])``."""
    byte_order, gtype = struct.unpack_from("<BI", buf, 0)
    if byte_order != _LE:  # big-endian unsupported; we only produce LE
        raise ValueError("big-endian WKB not supported")
    off = 5
    if gtype == WKB_POINT:
        x, y = struct.unpack_from("<dd", buf, off)
        return "point", (x, y)
    if gtype == WKB_POLYGON:
        rings, _ = _read_polygon_body(buf, off)
        return "polygon", rings
    if gtype == WKB_MULTIPOLYGON:
        (npoly,) = struct.unpack_from("<I", buf, off)
        off += 4
        polys = []
        for _ in range(npoly):
            bo, gt = struct.unpack_from("<BI", buf, off)
            if gt != WKB_POLYGON:
                raise ValueError(f"multipolygon member type {gt}")
            rings, off = _read_polygon_body(buf, off + 5)
            polys.append(rings)
        return "multipolygon", polys
    raise ValueError(f"unsupported WKB geometry type {gtype}")


def wkb_bounds(buf: bytes) -> tuple[float, float, float, float]:
    kind, data = parse_wkb(buf)
    if kind == "point":
        x, y = data
        return x, y, x, y
    if kind == "polygon":
        pts = np.vstack(data)
    else:
        pts = np.vstack([np.vstack(p) for p in data])
    return (
        float(pts[:, 0].min()),
        float(pts[:, 1].min()),
        float(pts[:, 0].max()),
        float(pts[:, 1].max()),
    )
