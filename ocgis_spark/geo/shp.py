"""Minimal ESRI shapefile writer (.shp/.shx/.dbf) — the reference's
fiona/OGR vector sink (``/root/reference/src/ocgis/conv/fiona_.py``)
without GDAL: pure ``struct`` packing of the published shapefile spec
(polygon type 5 + dBase III attribute table).

Scope (matches what the engine emits): Polygon / MultiPolygon WKB from
``geo.wkb``; numeric ('N') and character ('C') attributes. A shapefile
is a single seekable file triplet, so the write is driver-side — same
posture as the NetCDF export; the DISTRIBUTED vector sink remains
'wkb-parquet' (GeoParquet-style), this exists for interop with desktop
GIS consumers of the reference's outputs.

Spec details honored (and round-trip-tested against an independent
reader in tests):
* ring orientation: outer rings CLOCKWISE, holes COUNTER-clockwise;
* all multi-byte ints big-endian in headers/record headers, little-endian
  in record contents; lengths in 16-bit words;
* .shx record = (offset, content length) in 16-bit words;
* .dbf: version 0x03, 32-byte field descriptors, records prefixed with
  the deletion flag, fixed-width ASCII fields.
"""

from __future__ import annotations

import struct

import numpy as np

from . import geometry as G
from . import wkb as WKB

SHP_POLYGON = 5
SHP_NULL = 0


def _rings_oriented(polys: list[list[np.ndarray]]) -> list[np.ndarray]:
    """Flatten polygons to spec-oriented rings: outer CW, holes CCW
    (shoelace sign: CCW positive)."""
    out = []
    for rings in polys:
        for i, r in enumerate(rings):
            r = np.asarray(r, dtype="f8")
            if not (r[0] == r[-1]).all():
                r = np.vstack([r, r[:1]])
            area = G.ring_area(r)
            is_outer = i == 0
            if (is_outer and area > 0) or (not is_outer and area < 0):
                r = r[::-1]
            out.append(r)
    return out


def _polygon_record(polys: list[list[np.ndarray]]) -> bytes:
    rings = _rings_oriented(polys)
    pts = np.vstack(rings)
    parts, off = [], 0
    for r in rings:
        parts.append(off)
        off += len(r)
    body = struct.pack("<i4d", SHP_POLYGON,
                       float(pts[:, 0].min()), float(pts[:, 1].min()),
                       float(pts[:, 0].max()), float(pts[:, 1].max()))
    body += struct.pack("<2i", len(rings), len(pts))
    body += struct.pack(f"<{len(parts)}i", *parts)
    body += pts.astype("<f8").tobytes()
    return body


def _main_header(shape_type: int, file_len_words: int,
                 bbox: tuple[float, float, float, float]) -> bytes:
    h = struct.pack(">i5i i", 9994, 0, 0, 0, 0, 0, file_len_words)
    h += struct.pack("<2i", 1000, shape_type)
    h += struct.pack("<4d", *bbox)
    h += struct.pack("<4d", 0.0, 0.0, 0.0, 0.0)  # z/m ranges
    return h


def write_shapefile(
    path_base: str,
    geoms_wkb: list[bytes],
    attrs: list[dict] | None = None,
    fields: list[tuple[str, str, int, int]] | None = None,
) -> tuple[str, str, str]:
    """Write ``path_base``.shp/.shx/.dbf from WKB polygons.

    ``fields``: [(name, 'N'|'C', length, decimals)] — inferred from the
    first attr row if omitted. Returns the three paths."""
    if not geoms_wkb:
        raise ValueError("write_shapefile needs at least one geometry")
    attrs = attrs or [{} for _ in geoms_wkb]
    records = []
    gminx = gminy = float("inf")
    gmaxx = gmaxy = float("-inf")
    for buf in geoms_wkb:
        kind, data = WKB.parse_wkb(bytes(buf))
        if kind == "polygon":
            polys = [data]
        elif kind == "multipolygon":
            polys = data
        else:
            raise ValueError(f"shapefile sink writes polygons, got {kind}")
        rec = _polygon_record(polys)
        records.append(rec)
        minx, miny, maxx, maxy = struct.unpack_from("<4d", rec, 4)
        gminx, gminy = min(gminx, minx), min(gminy, miny)
        gmaxx, gmaxy = max(gmaxx, maxx), max(gmaxy, maxy)

    shp_path, shx_path, dbf_path = (
        path_base + ".shp", path_base + ".shx", path_base + ".dbf"
    )
    # ---- .shp + .shx ----
    content_words = sum(4 + len(r) // 2 for r in records)
    bbox = (gminx, gminy, gmaxx, gmaxy)
    with open(shp_path, "wb") as shp, open(shx_path, "wb") as shx:
        shp.write(_main_header(SHP_POLYGON, 50 + content_words, bbox))
        shx.write(_main_header(SHP_POLYGON, 50 + 4 * len(records), bbox))
        offset_words = 50
        for i, rec in enumerate(records):
            clen = len(rec) // 2
            shx.write(struct.pack(">2i", offset_words, clen))
            shp.write(struct.pack(">2i", i + 1, clen))
            shp.write(rec)
            offset_words += 4 + clen

    # ---- .dbf ----
    if fields is None:
        fields = []
        sample = attrs[0] if attrs else {}
        for k, v in sample.items():
            if isinstance(v, (int, float, np.integer, np.floating)):
                fields.append((k, "N", 24, 6))
            else:
                fields.append((k, "C", 64, 0))
    if not fields:
        fields = [("FID", "N", 11, 0)]
        attrs = [{"FID": i} for i in range(len(records))]
    rec_size = 1 + sum(f[2] for f in fields)
    hdr_size = 32 + 32 * len(fields) + 1
    with open(dbf_path, "wb") as dbf:
        dbf.write(struct.pack("<4B I 2H 20x", 3, 95, 7, 26,
                              len(records), hdr_size, rec_size))
        for name, ftype, flen, fdec in fields:
            nm = name.encode("ascii", "replace")[:10].ljust(11, b"\x00")
            dbf.write(nm + ftype.encode("ascii")
                      + b"\x00" * 4
                      + struct.pack("<2B", flen, fdec)
                      + b"\x00" * 14)
        dbf.write(b"\x0d")
        for row in attrs:
            dbf.write(b" ")
            for name, ftype, flen, fdec in fields:
                v = row.get(name, "")
                if ftype == "N":
                    s = ("" if v == "" else f"{float(v):.{fdec}f}")[:flen]
                    dbf.write(s.rjust(flen).encode("ascii"))
                else:
                    dbf.write(str(v)[:flen].ljust(flen).encode(
                        "ascii", "replace"))
        dbf.write(b"\x1a")

    # .prj sidecar: WGS84 — the engine's working CRS; desktop GIS tools
    # refuse to georeference the triplet without it
    with open(path_base + ".prj", "w") as prj:
        prj.write(
            'GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",'
            'SPHEROID["WGS_1984",6378137.0,298.257223563]],'
            'PRIMEM["Greenwich",0.0],'
            'UNIT["Degree",0.0174532925199433]]'
        )
    return shp_path, shx_path, dbf_path


# ---- reader (GeomCabinet's shapefile scan, reference util/geom_cabinet
# via fiona — here: the same struct layout in reverse) ----

def _split_polygons(rings: list[np.ndarray]) -> list[list[np.ndarray]]:
    """Shapefile polygon records interleave outers (CW) and holes (CCW)
    with no explicit nesting: group each hole with the outer containing
    its first vertex (the standard reconstruction)."""
    outers = [[r] for r in rings if G.ring_area(r) < 0]  # CW = outer
    if not outers:  # degenerate: treat everything as outers
        return [[r] for r in rings]
    for h in rings:
        if G.ring_area(h) < 0:
            continue
        px, py = np.array([h[0, 0]]), np.array([h[0, 1]])
        for poly in outers:
            if G.points_in_polygon(px, py, [poly[0]], keep_touches=True)[0]:
                poly.append(h)
                break
    return outers


def read_shapefile(path_base: str) -> list[tuple[int, list[list[np.ndarray]], dict]]:
    """Read ``path_base``.shp (+ .dbf if present) →
    ``[(fid, [[outer, holes...], ...], attrs), ...]``. Rings come back in
    WKB orientation (outer CCW, holes CW) ready for
    ``wkb.polygon_to_wkb`` / the subset kernels."""
    shp = open(path_base + ".shp", "rb").read()
    if struct.unpack(">i", shp[:4])[0] != 9994:
        raise ValueError(f"{path_base}.shp: not a shapefile (bad file code)")
    feats = []
    off = 100
    while off < len(shp):
        recno, clen = struct.unpack(">2i", shp[off:off + 8])
        off += 8
        (stype,) = struct.unpack("<i", shp[off:off + 4])
        if stype == SHP_NULL:
            feats.append((recno, []))
        elif stype == SHP_POLYGON:
            nparts, npts = struct.unpack("<2i", shp[off + 36:off + 44])
            parts = struct.unpack(
                f"<{nparts}i", shp[off + 44:off + 44 + 4 * nparts]
            )
            pts = np.frombuffer(
                shp, "<f8", count=2 * npts, offset=off + 44 + 4 * nparts
            ).reshape(npts, 2).copy()
            bounds = list(parts) + [npts]
            rings = [pts[bounds[i]:bounds[i + 1]] for i in range(nparts)]
            polys = _split_polygons(rings)
            # reorient to WKB convention: outer CCW, holes CW
            out_polys = []
            for poly in polys:
                fixed = []
                for i, r in enumerate(poly):
                    area = G.ring_area(r)
                    if (i == 0 and area < 0) or (i > 0 and area > 0):
                        r = r[::-1]
                    fixed.append(np.ascontiguousarray(r))
                out_polys.append(fixed)
            feats.append((recno, out_polys))
        else:
            raise ValueError(f"unsupported shape type {stype}")
        off += clen * 2

    attrs_rows: list[dict] = [{} for _ in feats]
    try:
        dbf = open(path_base + ".dbf", "rb").read()
    except FileNotFoundError:
        dbf = None
    if dbf:
        nrec, hdr, rsz = struct.unpack("<IHH", dbf[4:12])
        fields, f_off = [], 32
        while dbf[f_off] != 0x0D:
            name = dbf[f_off:f_off + 11].rstrip(b"\x00").decode("ascii")
            ftype = chr(dbf[f_off + 11])
            flen = dbf[f_off + 16]
            fields.append((name, ftype, flen))
            f_off += 32
        for i in range(min(nrec, len(feats))):
            rec = dbf[hdr + i * rsz: hdr + (i + 1) * rsz]
            vals, p = {}, 1
            for name, ftype, flen in fields:
                raw = rec[p:p + flen].decode("ascii", "replace").strip()
                if ftype == "N" and raw:
                    vals[name] = float(raw) if "." in raw else int(raw)
                else:
                    vals[name] = raw
                p += flen
            attrs_rows[i] = vals
        # a UGID/FID-style numeric field overrides the record number
    out = []
    for (recno, polys), attrs in zip(feats, attrs_rows):
        fid = recno
        for key in ("UGID", "ugid", "FID", "fid"):
            if key in attrs and isinstance(attrs[key], (int, float)):
                fid = int(attrs[key])
                break
        out.append((fid, polys, attrs))
    return out
