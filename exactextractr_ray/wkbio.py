"""Minimal pure-numpy WKB reader/writer (no shapely in this environment).

Supports the geometry types the reference accepts (EWKB from R via
``sf::st_as_binary(..., EWKB=TRUE)`` — /root/reference/R/exact_extract.R:527):
Point, LineString, Polygon, MultiPoint, MultiLineString, MultiPolygon and
GeometryCollection. Z/M coordinates are parsed and dropped (the reference's
GEOS reader does the same); EWKB SRID fields are skipped.

Geometries are represented as plain dicts:

``{"type": "Polygon", "rings": [np.ndarray (N,2), ...]}`` — first ring is the
shell, the rest holes; ring orientation is normalized on read (shell CCW,
holes CW) so the coverage kernel can rely on winding signs.
``{"type": "LineString", "coords": np.ndarray (N,2)}``
``{"type": "Point", "coords": np.ndarray (1,2)}``

``parse_wkb`` returns a flat list of such parts (Multi*/collections are
flattened, mirroring the flattening in
/root/reference/src/exactextract/src/raster_cell_intersection.cpp:250-259).
"""

from __future__ import annotations

import struct

import numpy as np

_PT, _LS, _PG, _MPT, _MLS, _MPG, _GC = 1, 2, 3, 4, 5, 6, 7

# EWKB high-bit flags
_Z_FLAG = 0x80000000
_M_FLAG = 0x40000000
_SRID_FLAG = 0x20000000
_ISO_Z = 1000
_ISO_M = 2000


def ring_area_signed(coords: np.ndarray) -> float:
    """Shoelace signed area; CCW positive. Mirrors the reference's
    area_signed (/root/reference/src/exactextract/src/measures.cpp:21-51)."""
    x = coords[:, 0]
    y = coords[:, 1]
    return 0.5 * float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))


class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def geometry(self) -> list[dict]:
        bo = "<" if self.buf[self.pos] == 1 else ">"
        self.pos += 1
        (type_code,) = struct.unpack_from(bo + "I", self.buf, self.pos)
        self.pos += 4

        ndim = 2
        if type_code & _Z_FLAG:
            ndim += 1
        if type_code & _M_FLAG:
            ndim += 1
        has_srid = bool(type_code & _SRID_FLAG)
        base = type_code & 0x0FFFFFFF
        # ISO WKB encodes Z/M as +1000/+2000 offsets
        if base >= _ISO_M:
            base -= _ISO_M
            ndim += 1
        if base >= _ISO_Z:
            base -= _ISO_Z
            ndim += 1
        if has_srid:
            self.pos += 4

        if base == _PT:
            return [{"type": "Point", "coords": self._coords(bo, 1, ndim)}]
        if base == _LS:
            (n,) = struct.unpack_from(bo + "I", self.buf, self.pos)
            self.pos += 4
            return [{"type": "LineString", "coords": self._coords(bo, n, ndim)}]
        if base == _PG:
            (nrings,) = struct.unpack_from(bo + "I", self.buf, self.pos)
            self.pos += 4
            rings = []
            for i in range(nrings):
                (n,) = struct.unpack_from(bo + "I", self.buf, self.pos)
                self.pos += 4
                ring = self._coords(bo, n, ndim)
                # normalize: shell CCW (positive area), holes CW
                area = ring_area_signed(ring)
                want_ccw = i == 0
                if (area < 0) == want_ccw:
                    ring = ring[::-1].copy()
                rings.append(ring)
            return [{"type": "Polygon", "rings": rings}]
        if base in (_MPT, _MLS, _MPG, _GC):
            (n,) = struct.unpack_from(bo + "I", self.buf, self.pos)
            self.pos += 4
            parts: list[dict] = []
            for _ in range(n):
                parts.extend(self.geometry())
            return parts
        raise ValueError(f"unsupported WKB geometry type {type_code}")

    def _coords(self, bo: str, n: int, ndim: int) -> np.ndarray:
        nvals = n * ndim
        vals = np.frombuffer(
            self.buf, dtype=("<f8" if bo == "<" else ">f8"), count=nvals, offset=self.pos
        )
        self.pos += nvals * 8
        arr = vals.reshape(n, ndim)[:, :2]
        return np.ascontiguousarray(arr, dtype=np.float64)


def parse_wkb(buf: bytes) -> list[dict]:
    """Parse WKB/EWKB bytes into a flat list of geometry parts."""
    return _Reader(bytes(buf)).geometry()


def polygon_parts(parts: list[dict]) -> list[dict]:
    return [p for p in parts if p["type"] == "Polygon"]


def line_parts(parts: list[dict]) -> list[dict]:
    return [p for p in parts if p["type"] == "LineString"]


def parts_envelope(parts: list[dict]) -> tuple[float, float, float, float]:
    """(xmin, ymin, xmax, ymax) over all coordinates of all parts."""
    xmins, ymins, xmaxs, ymaxs = [], [], [], []
    for p in parts:
        arrs = p["rings"] if p["type"] == "Polygon" else [p["coords"]]
        for a in arrs:
            xmins.append(a[:, 0].min())
            xmaxs.append(a[:, 0].max())
            ymins.append(a[:, 1].min())
            ymaxs.append(a[:, 1].max())
    return (min(xmins), min(ymins), max(xmaxs), max(ymaxs))


# ---------- WKT reader (test fixtures use real-world WKT) ----------


def _parse_ring_text(txt: str) -> np.ndarray:
    pts = []
    for pair in txt.split(","):
        xy = pair.split()
        pts.append((float(xy[0]), float(xy[1])))
    return np.asarray(pts, dtype=np.float64)


def _split_top_level(txt: str) -> list[str]:
    """Split 'a),(b' style lists at depth-0 commas."""
    out, depth, start = [], 0, 0
    for i, ch in enumerate(txt):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            out.append(txt[start:i])
            start = i + 1
    out.append(txt[start:])
    return [s.strip() for s in out]


def _normalize_polygon(rings_txt: list[str]) -> dict:
    rings = []
    for i, rt in enumerate(rings_txt):
        ring = _parse_ring_text(rt.strip().strip("()"))
        area = ring_area_signed(ring)
        want_ccw = i == 0
        if (area < 0) == want_ccw:
            ring = ring[::-1].copy()
        rings.append(ring)
    return {"type": "Polygon", "rings": rings}


def parse_wkt(wkt: str) -> list[dict]:
    """Parse POLYGON / MULTIPOLYGON / LINESTRING / POINT WKT into the same
    flat part-list structure as parse_wkb."""
    s = wkt.strip().strip('"').strip()
    kind, _, body = s.partition("(")
    kind = kind.strip().upper()
    body = body.rsplit(")", 1)[0]
    if kind == "POLYGON":
        return [_normalize_polygon(_split_top_level(body))]
    if kind == "MULTIPOLYGON":
        parts = []
        for poly_txt in _split_top_level(body):
            inner = poly_txt.strip()
            inner = inner[1:-1] if inner.startswith("(") else inner
            parts.append(_normalize_polygon(_split_top_level(inner)))
        return parts
    if kind == "LINESTRING":
        return [{"type": "LineString", "coords": _parse_ring_text(body)}]
    if kind == "POINT":
        return [{"type": "Point", "coords": _parse_ring_text(body)}]
    raise ValueError(f"unsupported WKT type {kind!r}")


# ---------- writers (used by fixtures / zone synthesis) ----------


def _write_ring(ring: np.ndarray) -> bytes:
    ring = np.asarray(ring, dtype=np.float64)
    if not np.array_equal(ring[0], ring[-1]):
        ring = np.vstack([ring, ring[:1]])
    return struct.pack("<I", len(ring)) + ring.astype("<f8").tobytes()


def polygon_wkb(shell, holes=()) -> bytes:
    out = struct.pack("<BII", 1, _PG, 1 + len(holes))
    out += _write_ring(np.asarray(shell))
    for h in holes:
        out += _write_ring(np.asarray(h))
    return out


def multipolygon_wkb(polys: list[tuple]) -> bytes:
    """polys: list of (shell, holes) tuples."""
    out = struct.pack("<BII", 1, _MPG, len(polys))
    for shell, holes in polys:
        out += polygon_wkb(shell, holes)
    return out


def linestring_wkb(coords) -> bytes:
    coords = np.asarray(coords, dtype=np.float64)
    return struct.pack("<BII", 1, _LS, len(coords)) + coords.astype("<f8").tobytes()


def point_wkb(x: float, y: float) -> bytes:
    return struct.pack("<BIdd", 1, _PT, x, y)


def rect_wkb(xmin: float, ymin: float, xmax: float, ymax: float) -> bytes:
    """Axis-aligned rectangle polygon (CCW), like the reference test helper
    make_rect (/root/reference/tests/testthat/helper_functions.R:16-24)."""
    return polygon_wkb(
        [(xmin, ymin), (xmax, ymin), (xmax, ymax), (xmin, ymax), (xmin, ymin)]
    )


def circle_wkb(cx: float, cy: float, r: float, segments: int = 30) -> bytes:
    """Buffered-point 'circle' polygon, like make_circle
    (/root/reference/tests/testthat/helper_functions.R:26-37)."""
    theta = np.linspace(0.0, 2.0 * np.pi, segments + 1)
    pts = np.column_stack([cx + r * np.cos(theta), cy + r * np.sin(theta)])
    pts[-1] = pts[0]
    return polygon_wkb(pts)
