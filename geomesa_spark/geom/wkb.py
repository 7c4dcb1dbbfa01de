"""WKB codec (little-endian ISO WKB, the wire format for geometry columns).

Geometry columns in the engine are ``BinaryType`` WKB — the same choice as the
reference's own PySpark bridge, which serializes geometry UDTs as a single
WKB field (geomesa_pyspark/types.py:8-27 backed by AbstractGeometryUDT).

Batch helpers convert between WKB byte columns and coordinate arrays without
per-row Python in the common all-points case.
"""

from __future__ import annotations

import struct

import numpy as np

from geomesa_spark.geom import model

_POINT, _LINESTRING, _POLYGON = 1, 2, 3
_MULTIPOINT, _MULTILINESTRING, _MULTIPOLYGON, _COLLECTION = 4, 5, 6, 7

_TYPE_CODES = {
    "Point": _POINT, "LineString": _LINESTRING, "Polygon": _POLYGON,
    "MultiPoint": _MULTIPOINT, "MultiLineString": _MULTILINESTRING,
    "MultiPolygon": _MULTIPOLYGON, "GeometryCollection": _COLLECTION,
}


def wkb_dumps(geom: model.Geometry) -> bytes:
    out = bytearray()
    _write(geom, out)
    return bytes(out)


def _write(geom: model.Geometry, out: bytearray) -> None:
    out.append(1)  # little-endian
    code = _TYPE_CODES[geom.geom_type]
    out += struct.pack("<I", code)
    if code == _POINT:
        out += struct.pack("<dd", geom.x, geom.y)
    elif code == _LINESTRING:
        out += struct.pack("<I", len(geom.coords))
        out += geom.coords.astype("<f8").tobytes()
    elif code == _POLYGON:
        rings = [geom.shell] + geom.holes
        out += struct.pack("<I", len(rings))
        for ring in rings:
            out += struct.pack("<I", len(ring))
            out += ring.astype("<f8").tobytes()
    else:
        parts = (geom.points if code == _MULTIPOINT else
                 geom.lines if code == _MULTILINESTRING else
                 geom.polygons if code == _MULTIPOLYGON else geom.geoms)
        out += struct.pack("<I", len(parts))
        for part in parts:
            _write(part, out)


def wkb_loads(data: bytes) -> model.Geometry:
    geom, _ = _read(memoryview(data), 0)
    return geom


def _read(buf: memoryview, off: int) -> tuple[model.Geometry, int]:
    little = buf[off] == 1
    fmt = "<" if little else ">"
    code = struct.unpack_from(fmt + "I", buf, off + 1)[0] & 0xFF  # strip SRID/Z flags
    off += 5
    if code == _POINT:
        x, y = struct.unpack_from(fmt + "dd", buf, off)
        return model.Point(x, y), off + 16
    if code == _LINESTRING:
        n = struct.unpack_from(fmt + "I", buf, off)[0]
        off += 4
        coords = np.frombuffer(buf, dtype=fmt + "f8", count=2 * n, offset=off).reshape(n, 2)
        return model.LineString(coords.copy()), off + 16 * n
    if code == _POLYGON:
        nr = struct.unpack_from(fmt + "I", buf, off)[0]
        off += 4
        rings = []
        for _ in range(nr):
            n = struct.unpack_from(fmt + "I", buf, off)[0]
            off += 4
            coords = np.frombuffer(buf, dtype=fmt + "f8", count=2 * n, offset=off).reshape(n, 2)
            rings.append(coords.copy())
            off += 16 * n
        return model.Polygon(rings[0], rings[1:]), off
    if code in (_MULTIPOINT, _MULTILINESTRING, _MULTIPOLYGON, _COLLECTION):
        n = struct.unpack_from(fmt + "I", buf, off)[0]
        off += 4
        parts = []
        for _ in range(n):
            g, off = _read(buf, off)
            parts.append(g)
        if code == _MULTIPOINT:
            return model.MultiPoint(parts), off
        if code == _MULTILINESTRING:
            return model.MultiLineString(parts), off
        if code == _MULTIPOLYGON:
            return model.MultiPolygon(parts), off
        return model.GeometryCollection(parts), off
    raise ValueError(f"unsupported WKB type code {code}")


# --------------------------------------------------------------------------
# batch (column) helpers
# --------------------------------------------------------------------------

_POINT_WKB_LEN = 21


def points_to_wkb(x: np.ndarray, y: np.ndarray) -> list[bytes]:
    """Vectorized point WKB construction: one buffer build, then slicing."""
    n = len(x)
    buf = np.zeros((n, _POINT_WKB_LEN), dtype=np.uint8)
    buf[:, 0] = 1
    buf[:, 1] = _POINT
    buf[:, 5:13] = np.asarray(x, dtype="<f8").view(np.uint8).reshape(n, 8)
    buf[:, 13:21] = np.asarray(y, dtype="<f8").view(np.uint8).reshape(n, 8)
    raw = buf.tobytes()
    return [raw[i * _POINT_WKB_LEN:(i + 1) * _POINT_WKB_LEN] for i in range(n)]


def wkb_to_points(col) -> tuple[np.ndarray, np.ndarray]:
    """Extract x,y from a column of WKB values; all-point fast path, general
    fallback = centroid of each geometry."""
    vals = list(col)
    n = len(vals)
    x = np.full(n, np.nan)
    y = np.full(n, np.nan)
    for i, v in enumerate(vals):
        if v is None:
            continue
        if len(v) == _POINT_WKB_LEN and v[0] == 1 and v[1] == _POINT:
            x[i], y[i] = struct.unpack_from("<dd", v, 5)
        else:
            c = wkb_loads(bytes(v)).centroid()
            x[i], y[i] = c.x, c.y
    return x, y


def wkb_bounds(col) -> np.ndarray:
    """(n,4) array of xmin,ymin,xmax,ymax per WKB value."""
    vals = list(col)
    out = np.full((len(vals), 4), np.nan)
    for i, v in enumerate(vals):
        if v is None:
            continue
        if len(v) == _POINT_WKB_LEN and v[0] == 1 and v[1] == _POINT:
            px, py = struct.unpack_from("<dd", v, 5)
            out[i] = (px, py, px, py)
        else:
            out[i] = wkb_loads(bytes(v)).bounds
    return out
