"""Dependency-free WKB codec.

Parses ISO WKB and EWKB (Z/M/ZM variants in either encoding, both
byte orders) into a light tuple representation, and encodes back to
2D little-endian ISO WKB. This replaces the reference's shapely
``wkb.loads``/``wkb.dumps`` round-trip (reference source.py:734-751,
transform.py:207-214 — the Force2D trick is exactly "decode with Z,
re-encode 2D").

Geometry representation (pure Python, cheap to build in Arrow
batches):

- ``("Point", (x, y))`` — empty point: coords ``None``
- ``("LineString", [(x, y), ...])``
- ``("Polygon", [ring, ...])`` — ring = list of (x, y), first ring is
  the exterior shell
- ``("MultiPoint" | "MultiLineString" | "MultiPolygon" |
  "GeometryCollection", [geom, ...])`` of child tuples
"""

from __future__ import annotations

import struct
from typing import Any

Geom = tuple[str, Any]

_TYPE_NAMES = {
    1: "Point",
    2: "LineString",
    3: "Polygon",
    4: "MultiPoint",
    5: "MultiLineString",
    6: "MultiPolygon",
    7: "GeometryCollection",
}
_TYPE_CODES = {v: k for k, v in _TYPE_NAMES.items()}

_EWKB_Z = 0x80000000
_EWKB_M = 0x40000000
_EWKB_SRID = 0x20000000

_NAN = float("nan")


def _parse(buf: bytes, off: int) -> tuple[Geom, int]:
    byte_order = buf[off]
    endian = "<" if byte_order == 1 else ">"
    (raw_type,) = struct.unpack_from(endian + "I", buf, off + 1)
    off += 5

    has_srid = bool(raw_type & _EWKB_SRID)
    ndims = 2
    if raw_type & _EWKB_Z:
        ndims += 1
    if raw_type & _EWKB_M:
        ndims += 1
    base = raw_type & 0x0FFFFFFF
    if base >= 1000:  # ISO: 1000=Z, 2000=M, 3000=ZM
        iso_flag = base // 1000
        ndims = 2 + (2 if iso_flag == 3 else 1)
        base = base % 1000
    if has_srid:
        off += 4  # skip SRID — engine convention is EPSG:4326 everywhere

    name = _TYPE_NAMES.get(base)
    if name is None:
        raise ValueError(f"unsupported WKB type code {raw_type}")

    if name == "Point":
        coords = struct.unpack_from(f"{endian}{ndims}d", buf, off)
        off += 8 * ndims
        x, y = coords[0], coords[1]
        if x != x and y != y:  # NaN-NaN encodes POINT EMPTY
            return ("Point", None), off
        return ("Point", (x, y)), off

    (n,) = struct.unpack_from(endian + "I", buf, off)
    off += 4

    if name == "LineString":
        flat = struct.unpack_from(f"{endian}{n * ndims}d", buf, off)
        off += 8 * n * ndims
        return ("LineString", [(flat[i * ndims], flat[i * ndims + 1]) for i in range(n)]), off

    if name == "Polygon":
        rings = []
        for _ in range(n):
            (m,) = struct.unpack_from(endian + "I", buf, off)
            off += 4
            flat = struct.unpack_from(f"{endian}{m * ndims}d", buf, off)
            off += 8 * m * ndims
            rings.append([(flat[i * ndims], flat[i * ndims + 1]) for i in range(m)])
        return ("Polygon", rings), off

    # Multi* / GeometryCollection: children are full WKB geometries
    children = []
    for _ in range(n):
        child, off = _parse(buf, off)
        children.append(child)
    return (name, children), off


def loads(buf: bytes | bytearray | memoryview) -> Geom:
    """G8 — WKB decode: bytes/bytearray → geometry tuple (Z/M
    coordinates dropped → 2D, which also realizes G1 Force-2D;
    reference source.py:734-751, transform.py:207-214)."""
    if isinstance(buf, (bytearray, memoryview)):
        buf = bytes(buf)
    geom, _ = _parse(buf, 0)
    return geom


def dumps(geom: Geom) -> bytes:
    """Geometry tuple → 2D little-endian ISO WKB."""
    name, body = geom
    out = bytearray()
    out.append(1)
    out += struct.pack("<I", _TYPE_CODES[name])
    if name == "Point":
        if body is None:
            out += struct.pack("<2d", _NAN, _NAN)
        else:
            out += struct.pack("<2d", body[0], body[1])
    elif name == "LineString":
        out += struct.pack("<I", len(body))
        for x, y in body:
            out += struct.pack("<2d", x, y)
    elif name == "Polygon":
        out += struct.pack("<I", len(body))
        for ring in body:
            out += struct.pack("<I", len(ring))
            for x, y in ring:
                out += struct.pack("<2d", x, y)
    else:
        out += struct.pack("<I", len(body))
        for child in body:
            out += dumps(child)
    return bytes(out)


def geometry_type(buf: bytes) -> str:
    """Type name without full coordinate decode (header peek)."""
    endian = "<" if buf[0] == 1 else ">"
    (raw_type,) = struct.unpack_from(endian + "I", buf, 1)
    base = raw_type & 0x0FFFFFFF
    if base >= 1000:
        base = base % 1000
    name = _TYPE_NAMES.get(base)
    if name is None:
        raise ValueError(f"unsupported WKB type code {raw_type}")
    return name


def point(x: float, y: float) -> bytes:
    return dumps(("Point", (x, y)))


def linestring(coords: list[tuple[float, float]]) -> bytes:
    return dumps(("LineString", coords))


def polygon(rings: list[list[tuple[float, float]]]) -> bytes:
    return dumps(("Polygon", rings))
