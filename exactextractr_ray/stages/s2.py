"""True spherical S2 cell ids (cube-face + quadratic s/t + Hilbert curve).

The north rule names "H3/S2 index" as a first-class surface.  stages/spatial.py
already provides the planar analogs (Hilbert xy2d key, hex binning); this
module implements the REAL S2 cell-id scheme from the published algorithm
(s2geometry.io docs + the Apache-licensed reference description):

* a point on the unit sphere is projected to one of 6 cube faces
  (face = axis of the largest |component|, + 3 when negative);
* the face (u, v) gnomonic coordinates pass through the QUADRATIC s/t
  transform s = 1/2*sqrt(1+3u) (u >= 0) / 1 - 1/2*sqrt(1-3u) (u < 0), which
  equalizes cell areas to within ~2.1x across a face;
* (s, t) is discretized to 30-bit (i, j) leaf coordinates;
* the leaf position along the face's Hilbert curve is computed 4 bits at a
  time with the classic orientation lookup table (kPosToIJ /
  kPosToOrientation), giving the 64-bit cell id
  ``face(3 bits) | curve position(60 bits) | trailing 1``.

Everything is vectorized numpy (one pass per 4-bit chunk, no Python per
row); cell ids are uint64 exactly like the reference library.  The
``*_from_xyz`` path is trig-free — every float op (divide, 3*u, 1+-x, sqrt,
0.5*, floor) is a single correctly-rounded IEEE operation, so
``synth.s2_cell_sql`` reproduces it BIT-EXACTLY in DuckDB (the lookup table
is embedded as a 1024-row VALUES relation joined once per 4-bit chunk).
The lon/lat front-end uses cos/sin (libm-dependent, so pytest-verified by
geometric invariants rather than the SQL oracle: cardinal-point faces,
cell-center round-trip at leaf level, parent containment, curve adjacency).

At 100 TB this key is the partitioner: s2_parent(id, k) is pure integer
math, so multi-resolution rollups are a prefix groupby exactly like the
geohash/Morton keys, while Hilbert locality keeps range-partitioned worker
regions compact (low perimeter) — the property Morton lacks at quadrant
seams.

Reference surface: exactextractr has no spatial index (zones stream
feature-by-feature, /root/reference/src/exactextract/src/processor.h);
this is north-rule machinery, not a port.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MAX_LEVEL = 30
_LOOKUP_BITS = 4
_SWAP = 1
_INVERT = 2

# Canonical Hilbert sub-cell orderings (public constants).
POS_TO_IJ = ((0, 1, 3, 2), (0, 2, 3, 1), (3, 2, 0, 1), (3, 1, 0, 2))
POS_TO_ORIENTATION = (_SWAP, 0, 0, _INVERT + _SWAP)


def _build_lookup() -> tuple[np.ndarray, np.ndarray]:
    """lookup_pos[(ij << 2) | orient] = (pos << 2) | new_orient and its
    inverse, for 4-level (16x16) Hilbert blocks."""
    lookup_pos = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.int64)
    lookup_ij = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.int64)

    def rec(level: int, i: int, j: int, orig: int, pos: int, orient: int):
        if level == _LOOKUP_BITS:
            ij = (i << _LOOKUP_BITS) + j
            lookup_pos[(ij << 2) + orig] = (pos << 2) + orient
            lookup_ij[(pos << 2) + orig] = (ij << 2) + orient
            return
        r = POS_TO_IJ[orient]
        for index in range(4):
            rec(
                level + 1,
                (i << 1) + (r[index] >> 1),
                (j << 1) + (r[index] & 1),
                orig,
                (pos << 2) + index,
                orient ^ POS_TO_ORIENTATION[index],
            )

    for orient in range(4):
        rec(0, 0, 0, orient, 0, orient)
    return lookup_pos, lookup_ij


LOOKUP_POS, LOOKUP_IJ = _build_lookup()


# ---------------- forward: xyz -> (face, u, v) -> (i, j) -> cell id --------


def face_uv_from_xyz(
    x: np.ndarray, y: np.ndarray, z: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Cube face + gnomonic (u, v) for direction vectors (need not be unit —
    the projection is scale-invariant).  Tie-break: |x| >= |y| and |x| >= |z|
    picks x, else |y| >= |z| picks y, else z; negative major component adds 3
    (this exact >= chain is mirrored in synth.s2_cell_sql)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    z = np.asarray(z, dtype=np.float64)
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    x_major = (ax >= ay) & (ax >= az)
    y_major = ~x_major & (ay >= az)
    axis = np.where(x_major, 0, np.where(y_major, 1, 2))
    major = np.where(x_major, x, np.where(y_major, y, z))
    face = np.where(major > 0, axis, axis + 3).astype(np.int64)
    with np.errstate(divide="ignore", invalid="ignore"):
        u = np.select(
            [face == 0, face == 1, face == 2, face == 3, face == 4],
            [y / x, -x / y, -x / z, z / x, z / y],
            default=-y / z,
        )
        v = np.select(
            [face == 0, face == 1, face == 2, face == 3, face == 4],
            [z / x, z / y, -y / z, y / x, -x / y],
            default=-x / z,
        )
    return face, u, v


def st_from_uv(u: np.ndarray) -> np.ndarray:
    """Quadratic projection: equal-area-ish, and every op is one IEEE
    rounding (3*u, 1+-w, sqrt, 0.5*w, 1-w) so SQL reproduces it exactly."""
    with np.errstate(invalid="ignore"):  # np.where evaluates both branches
        return np.where(
            u >= 0.0, 0.5 * np.sqrt(1.0 + 3.0 * u), 1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u)
        )


def uv_from_st(s: np.ndarray) -> np.ndarray:
    s = np.asarray(s, dtype=np.float64)
    return np.where(
        s >= 0.5,
        (1.0 / 3.0) * (4.0 * s * s - 1.0),
        (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s)),
    )


def ij_from_st(s: np.ndarray) -> np.ndarray:
    n = np.int64(1) << MAX_LEVEL
    return np.clip(np.floor(s * np.float64(n)).astype(np.int64), 0, n - 1)


def cell_id_from_face_ij(
    face: np.ndarray, i: np.ndarray, j: np.ndarray, level: int = MAX_LEVEL
) -> np.ndarray:
    """64-bit cell id from leaf (i, j): 8 lookup passes of 4 bits each,
    vectorized.  ``level`` < 30 returns the ancestor at that level."""
    face = np.asarray(face, dtype=np.int64)
    i = np.asarray(i, dtype=np.int64)
    j = np.asarray(j, dtype=np.int64)
    n = face.astype(np.uint64) << np.uint64(60)
    bits = face & _SWAP
    for k in range(7, -1, -1):
        i4 = (i >> (k * 4)) & 15
        j4 = (j >> (k * 4)) & 15
        lut = LOOKUP_POS[(i4 << 6) + (j4 << 2) + bits]
        n |= (lut >> 2).astype(np.uint64) << np.uint64(k * 8)
        bits = lut & 3
    leaf = n * np.uint64(2) + np.uint64(1)
    if level >= MAX_LEVEL:
        return leaf
    return s2_parent(leaf, level)


def s2_parent(cell_id: np.ndarray, level: int) -> np.ndarray:
    """Ancestor at ``level``: keep the top 3 + 2*level bits, set the next
    bit (the trailing-1 marker), zero the rest.  Pure integer math —
    multi-resolution rollup is a prefix groupby."""
    cell_id = np.asarray(cell_id, dtype=np.uint64)
    k = np.uint64(61 - 2 * level)
    return ((cell_id >> k) << k) + (np.uint64(1) << (k - np.uint64(1)))


def s2_level(cell_id: int) -> int:
    """Level from the trailing-1 position (scalar helper)."""
    c = int(cell_id)
    lsb = c & -c
    return MAX_LEVEL - (lsb.bit_length() - 1) // 2


def s2_cell_from_xyz(
    x: np.ndarray, y: np.ndarray, z: np.ndarray, level: int = MAX_LEVEL
) -> np.ndarray:
    face, u, v = face_uv_from_xyz(x, y, z)
    i = ij_from_st(st_from_uv(u))
    j = ij_from_st(st_from_uv(v))
    return cell_id_from_face_ij(face, i, j, level)


def s2_cell_from_lonlat(
    lon: np.ndarray, lat: np.ndarray, level: int = MAX_LEVEL
) -> np.ndarray:
    """lat/lng -> unit vector -> cell id.  Uses cos/sin (libm), so this
    front-end is invariant-tested rather than SQL-oracled."""
    lam = np.radians(np.asarray(lon, dtype=np.float64))
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    cphi = np.cos(phi)
    return s2_cell_from_xyz(cphi * np.cos(lam), cphi * np.sin(lam), np.sin(phi), level)


# ---------------- inverse (scalar; used by tests + center computation) -----


def s2_to_face_ij(cell_id: int) -> tuple[int, int, int]:
    c = int(cell_id)
    face = c >> 61
    bits = face & _SWAP
    i = j = 0
    for k in range(7, -1, -1):
        nbits = MAX_LEVEL - 7 * _LOOKUP_BITS if k == 7 else _LOOKUP_BITS
        bits += ((c >> (k * 8 + 1)) & ((1 << (2 * nbits)) - 1)) << 2
        bits = int(LOOKUP_IJ[bits])
        i += (bits >> (_LOOKUP_BITS + 2)) << (k * 4)
        j += ((bits >> 2) & 15) << (k * 4)
        bits &= _SWAP | _INVERT
    return face, i, j


def xyz_from_face_uv(face: int, u: float, v: float) -> tuple[float, float, float]:
    return [
        (1.0, u, v),
        (-u, 1.0, v),
        (-u, -v, 1.0),
        (-1.0, -v, -u),
        (v, -1.0, -u),
        (v, u, -1.0),
    ][face]


def s2_cell_center_lonlat(cell_id: int) -> tuple[float, float]:
    """Center of the LEAF cell (i+1/2, j+1/2) of a leaf-level id."""
    face, i, j = s2_to_face_ij(cell_id)
    n = float(1 << MAX_LEVEL)
    u = float(uv_from_st(np.float64((i + 0.5) / n)))
    v = float(uv_from_st(np.float64((j + 0.5) / n)))
    x, y, z = xyz_from_face_uv(face, u, v)
    lon = np.degrees(np.arctan2(y, x))
    lat = np.degrees(np.arctan2(z, np.hypot(x, y)))
    return float(lon), float(lat)


# ---------------- Ray Data stage fronts ------------------------------------


def assign_s2_batch(
    batch: pa.Table, level: int = 12, parent_level: int | None = None
) -> pa.Table:
    """map_batches fn: append ``s2_id`` (uint64) from lon/lat columns;
    optionally also ``s2_parent{k}`` (the coarser rollup key)."""
    lon = batch.column("lon").to_numpy()
    lat = batch.column("lat").to_numpy()
    ids = s2_cell_from_lonlat(lon, lat, level)
    batch = batch.append_column("s2_id", pa.array(ids, type=pa.uint64()))
    if parent_level is not None:
        batch = batch.append_column(
            f"s2_parent{parent_level}",
            pa.array(s2_parent(ids, parent_level), type=pa.uint64()),
        )
    return batch


def assign_s2_xyz_batch(
    batch: pa.Table, level: int = 12, parent_level: int | None = None
) -> pa.Table:
    """Same, from direction-vector columns x/y/z (the trig-free, SQL-exact
    path used by the ``s2_cells`` driver query)."""
    x = batch.column("x").to_numpy()
    y = batch.column("y").to_numpy()
    z = batch.column("z").to_numpy()
    ids = s2_cell_from_xyz(x, y, z, level)
    batch = batch.append_column("s2_id", pa.array(ids, type=pa.uint64()))
    if parent_level is not None:
        batch = batch.append_column(
            f"s2_parent{parent_level}",
            pa.array(s2_parent(ids, parent_level), type=pa.uint64()),
        )
    return batch
