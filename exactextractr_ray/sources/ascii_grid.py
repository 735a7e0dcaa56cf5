"""Arc/Info ASCII Grid (.asc) raster source/sink — a GDAL-staple exchange
format (AAIGrid driver) behind the reference's band wrapper
(/root/reference/src/exactextract/src/gdal_raster_wrapper.cpp:22-95).

Format (public ESRI spec): a 5/6-line header (``ncols nrows
xllcorner|xllcenter yllcorner|yllcenter cellsize [nodata_value]``)
followed by row-major whitespace-separated values, row 0 = north. Both
corner and center registration conventions are handled.

Scale contract mirrors the GeoTIFF source: one file is the ingestion
unit; ``ascii_grid_raster_dataset`` converts to the engine's streaming
tile Dataset for everything downstream.
"""

from __future__ import annotations

import numpy as np

from ..grid import Grid


def read_ascii_grid(path: str) -> tuple[np.ndarray, Grid]:
    """.asc -> (float64 array with NaN nodata, Grid)."""
    header: dict[str, float] = {}
    data_start = 0
    with open(path, "rb") as f:
        raw = f.read()
    lines = raw.split(b"\n")
    for i, line in enumerate(lines[:6]):
        parts = line.split()
        if len(parts) == 2:
            try:
                header[parts[0].decode().lower()] = float(parts[1])
                data_start = i + 1
                continue
            except ValueError:
                pass
        break
    for key in ("ncols", "nrows", "cellsize"):
        if key not in header:
            raise ValueError(f"ASCII grid header missing {key}")
    ncols = int(header["ncols"])
    nrows = int(header["nrows"])
    dx = dy = header["cellsize"]

    body = b"\n".join(lines[data_start:])
    arr = np.array(body.split(), dtype=np.float64)
    if arr.size != nrows * ncols:
        raise ValueError(
            f"ASCII grid body has {arr.size} values, expected {nrows * ncols}"
        )
    arr = arr.reshape(nrows, ncols)
    nodata = header.get("nodata_value")
    if nodata is not None:
        arr[arr == nodata] = np.nan

    if "xllcorner" in header:
        xmin = header["xllcorner"]
    elif "xllcenter" in header:
        xmin = header["xllcenter"] - dx / 2.0
    else:
        raise ValueError("ASCII grid header missing xllcorner/xllcenter")
    if "yllcorner" in header:
        ymin = header["yllcorner"]
    elif "yllcenter" in header:
        ymin = header["yllcenter"] - dy / 2.0
    else:
        raise ValueError("ASCII grid header missing yllcorner/yllcenter")
    grid = Grid(xmin, ymin, xmin + ncols * dx, ymin + nrows * dy, dx, dy)
    return arr, grid


def write_ascii_grid(
    arr: np.ndarray, grid: Grid, path: str, nodata: float = -9999.0
) -> None:
    """(array, Grid) -> .asc. Requires square cells (the format has ONE
    cellsize); NaNs become ``nodata``. Round-trips through
    :func:`read_ascii_grid` (tested)."""
    if abs(grid.dx - grid.dy) > 1e-12 * abs(grid.dx):
        raise ValueError("ASCII grid requires square cells (dx == dy)")
    h, w = arr.shape
    a = np.where(np.isnan(arr), nodata, np.asarray(arr, dtype=np.float64))
    with open(path, "w") as f:
        f.write(
            f"ncols {w}\nnrows {h}\n"
            f"xllcorner {grid.xmin!r}\nyllcorner {grid.ymin!r}\n"
            f"cellsize {grid.dx!r}\nnodata_value {nodata!r}\n"
        )
        np.savetxt(f, a, fmt="%.17g")


def ascii_grid_raster_dataset(path: str, tile: int = 256):
    """.asc -> streaming tile Dataset (the engine's native form)."""
    from .raster import raster_from_array

    arr, grid = read_ascii_grid(path)
    return raster_from_array(arr, grid, tile=tile)
