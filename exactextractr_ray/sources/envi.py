"""ENVI raster format (.hdr text header + flat binary) — a GDAL-staple
exchange format behind the reference's band wrapper
(/root/reference/src/exactextract/src/gdal_raster_wrapper.cpp:22-95).

Supported: BSQ/BIL/BIP interleaves, ENVI data types 1/2/3/4/5/12 (u8,
i16, i32, f32, f64, u16), both byte orders, ``data ignore value`` ->
NaN, and georeferencing from the ``map info`` record (UTM or arbitrary
pixel-size form). The header grammar is the public ENVI spec: ``key =
value`` lines, ``{...}`` braced lists spanning lines.
"""

from __future__ import annotations

import re

import numpy as np

from ..grid import Grid

_DTYPES = {1: "u1", 2: "i2", 3: "i4", 4: "f4", 5: "f8", 12: "u2"}
_INV_DTYPES = {np.dtype(v).kind + str(np.dtype(v).itemsize): k
               for k, v in _DTYPES.items()}


def _parse_hdr(text: str) -> dict:
    if not text.lstrip().upper().startswith("ENVI"):
        raise ValueError("not an ENVI header")
    # fold braced lists into single logical lines
    text = re.sub(r"\{[^}]*\}", lambda m: m.group(0).replace("\n", " "), text)
    out = {}
    for line in text.splitlines()[1:]:
        if "=" not in line:
            continue
        k, v = line.split("=", 1)
        out[k.strip().lower()] = v.strip()
    return out


def read_envi(path: str, band: int = 1) -> tuple[np.ndarray, Grid]:
    """ENVI binary + .hdr -> (float64 array with NaN nodata, Grid).
    ``path`` is the binary file; the header is ``path + '.hdr'`` or the
    extension-swapped sibling. ``band`` is 1-based like GDAL."""
    import os

    hdr_path = path + ".hdr"
    if not os.path.exists(hdr_path):
        hdr_path = os.path.splitext(path)[0] + ".hdr"
    with open(hdr_path) as f:
        h = _parse_hdr(f.read())

    samples = int(h["samples"])
    lines = int(h["lines"])
    bands = int(h.get("bands", "1"))
    if not 1 <= band <= bands:
        raise ValueError(f"band {band} out of range (file has {bands})")
    dt = np.dtype(_DTYPES[int(h["data type"])])
    if int(h.get("byte order", "0")) == 1:
        dt = dt.newbyteorder(">")
    else:
        dt = dt.newbyteorder("<")
    interleave = h.get("interleave", "bsq").lower()
    offset = int(h.get("header offset", "0"))

    raw = np.fromfile(path, dtype=dt, count=samples * lines * bands,
                      offset=offset)
    if interleave == "bsq":
        arr = raw.reshape(bands, lines, samples)[band - 1]
    elif interleave == "bil":
        arr = raw.reshape(lines, bands, samples)[:, band - 1, :]
    elif interleave == "bip":
        arr = raw.reshape(lines, samples, bands)[:, :, band - 1]
    else:
        raise ValueError(f"unknown interleave {interleave!r}")
    arr = arr.astype(np.float64)

    ignore = h.get("data ignore value")
    if ignore is not None:
        arr[arr == float(ignore)] = np.nan

    mi = h.get("map info")
    if mi:
        parts = [p.strip() for p in mi.strip("{}").split(",")]
        # {proj, ref_x, ref_y, map_x, map_y, dx, dy, ...}: pixel (ref_x,
        # ref_y) is 1-based and anchors its UPPER-LEFT corner at (map_x,
        # map_y) (public ENVI convention)
        ref_x, ref_y = float(parts[1]), float(parts[2])
        map_x, map_y = float(parts[3]), float(parts[4])
        dx, dy = float(parts[5]), float(parts[6])
        xmin = map_x - (ref_x - 1.0) * dx
        ymax = map_y + (ref_y - 1.0) * dy
    else:
        dx = dy = 1.0
        xmin, ymax = 0.0, float(lines)
    grid = Grid(xmin, ymax - lines * dy, xmin + samples * dx, ymax, dx, dy)
    return np.ascontiguousarray(arr), grid


def write_envi(
    arr: np.ndarray,
    grid: Grid,
    path: str,
    nodata: float | None = None,
    dtype: str = "f8",
    interleave: str = "bsq",
) -> None:
    """(array[, bands], Grid) -> ENVI binary + .hdr. Round-trips through
    :func:`read_envi` (tested)."""
    a = np.asarray(arr, dtype=np.float64)
    if a.ndim == 2:
        a = a[:, :, None]
    lines, samples, bands = a.shape
    if nodata is not None:
        a = np.where(np.isnan(a), nodata, a)
    dt = np.dtype(dtype)
    code = _INV_DTYPES[dt.kind + str(dt.itemsize)]
    if dt.kind in "iu":
        a = np.round(a)

    if interleave == "bsq":
        body = np.ascontiguousarray(np.transpose(a, (2, 0, 1)), dtype=dt)
    elif interleave == "bil":
        body = np.ascontiguousarray(np.transpose(a, (0, 2, 1)), dtype=dt)
    elif interleave == "bip":
        body = np.ascontiguousarray(a, dtype=dt)
    else:
        raise ValueError(f"unknown interleave {interleave!r}")
    body.tofile(path)

    hdr = [
        "ENVI",
        f"samples = {samples}",
        f"lines = {lines}",
        f"bands = {bands}",
        "header offset = 0",
        "file type = ENVI Standard",
        f"data type = {code}",
        f"interleave = {interleave}",
        "byte order = 0",
        "map info = {Arbitrary, 1, 1, "
        f"{grid.xmin!r}, {grid.ymax!r}, {grid.dx!r}, {grid.dy!r}, units=Meters}}",
    ]
    if nodata is not None:
        hdr.append(f"data ignore value = {nodata!r}")
    with open(path + ".hdr", "w") as f:
        f.write("\n".join(hdr) + "\n")


def envi_raster_dataset(path: str, band: int = 1, tile: int = 256):
    """ENVI raster -> streaming tile Dataset (the engine's native form)."""
    from .raster import raster_from_array

    arr, grid = read_envi(path, band=band)
    return raster_from_array(arr, grid, tile=tile)
