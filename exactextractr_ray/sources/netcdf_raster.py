"""NetCDF classic (CDF-1/CDF-2) RASTER source — pure struct, no netCDF-C.

The reference reads netCDF rasters through GDAL's netCDF driver
(/root/reference/src/exactextract/src/gdal_raster_wrapper.cpp:22-95, any
GDAL-supported band), and its R helper even introspects netCDF block sizes
(/root/reference/R/exact_extract_helpers.R:388-431). This module covers the
raster half of that surface for the classic format (the public CDF spec):

* CDF-1 (32-bit offsets) and CDF-2 (64-bit offsets), big-endian;
* dimension / attribute / variable headers, byte/char/short/int/float/double;
* a 2-D data variable georeferenced by its 1-D coordinate variables
  (cell-center convention, ascending or descending latitude);
* ``_FillValue`` / ``missing_value`` -> NaN, CF ``scale_factor`` /
  ``add_offset`` unpacking.

The record dimension (UNLIMITED) is not needed for rasters and is rejected
explicitly. Scale contract mirrors the GeoTIFF source: ``read_netcdf_raster``
materializes one file (ingestion unit); ``netcdf_raster_dataset`` converts
to the engine's streaming tile Dataset for everything downstream.
"""

from __future__ import annotations

import struct

import numpy as np

from ..grid import Grid

_NC_TYPES = {1: ("b", 1), 2: ("c", 1), 3: (">i2", 2), 4: (">i4", 4),
             5: (">f4", 4), 6: (">f8", 8)}
_ABSENT = (0, 0)
_NC_DIMENSION, _NC_VARIABLE, _NC_ATTRIBUTE = 10, 11, 12


class _Reader:
    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0

    def u32(self) -> int:
        (v,) = struct.unpack(">I", self.d[self.pos : self.pos + 4])
        self.pos += 4
        return v

    def u64(self) -> int:
        (v,) = struct.unpack(">Q", self.d[self.pos : self.pos + 8])
        self.pos += 8
        return v

    def name(self) -> str:
        ln = self.u32()
        v = self.d[self.pos : self.pos + ln].decode()
        self.pos += ln + ((4 - ln % 4) % 4)
        return v

    def values(self, nc_type: int, n: int):
        fmt, size = _NC_TYPES[nc_type]
        total = n * size
        raw = self.d[self.pos : self.pos + total]
        self.pos += total + ((4 - total % 4) % 4)
        if nc_type == 2:
            return raw.decode("ascii", "replace")
        return np.frombuffer(raw, dtype=fmt if size > 1 else np.int8, count=n)

    def att_list(self) -> dict:
        tag, n = self.u32(), self.u32()
        atts = {}
        if (tag, n) == _ABSENT:
            return atts
        for _ in range(n):
            nm = self.name()
            typ = self.u32()
            cnt = self.u32()
            atts[nm] = self.values(typ, cnt)
        return atts


def _parse_header(data: bytes):
    if data[:3] != b"CDF" or data[3] not in (1, 2):
        raise ValueError("not a classic NetCDF (CDF-1/CDF-2) file")
    version = data[3]
    r = _Reader(data)
    r.pos = 4
    numrecs = r.u32()
    tag, ndims = r.u32(), r.u32()
    dims = []
    if (tag, ndims) != _ABSENT:
        for _ in range(ndims):
            dims.append((r.name(), r.u32()))
    gatts = r.att_list()
    tag, nvars = r.u32(), r.u32()
    vars = {}
    if (tag, nvars) != _ABSENT:
        for _ in range(nvars):
            nm = r.name()
            nd = r.u32()
            dimids = [r.u32() for _ in range(nd)]
            vatts = r.att_list()
            typ = r.u32()
            vsize = r.u32()
            begin = r.u64() if version == 2 else r.u32()
            vars[nm] = {
                "dims": dimids, "atts": vatts, "type": typ,
                "vsize": vsize, "begin": begin,
            }
    return numrecs, dims, gatts, vars


def _read_var(data: bytes, dims, v) -> np.ndarray:
    fmt, size = _NC_TYPES[v["type"]]
    shape = tuple(dims[d][1] for d in v["dims"])
    n = int(np.prod(shape)) if shape else 1
    dt = np.int8 if size == 1 and v["type"] != 2 else np.dtype(fmt)
    arr = np.frombuffer(data, dtype=dt, count=n, offset=v["begin"])
    return arr.reshape(shape)


def read_netcdf_raster(
    path: str, var: str | None = None
) -> tuple[np.ndarray, Grid]:
    """Read one 2-D variable as (float64 array with NaN nodata, Grid).

    ``var=None`` picks the first 2-D non-coordinate variable (GDAL's
    subdataset-default behavior). Georeferencing comes from the 1-D
    coordinate variables named after the variable's dimensions (cell
    centers); latitude may be stored ascending or descending — the output
    is always row-0-north, matching the engine's raster convention."""
    with open(path, "rb") as f:
        data = f.read()
    numrecs, dims, _gatts, vars = _parse_header(data)
    dim_names = [d[0] for d in dims]

    if var is None:
        var = next(
            (nm for nm, v in vars.items()
             if len(v["dims"]) == 2 and nm not in dim_names),
            None,
        )
        if var is None:
            raise ValueError("no 2-D data variable found")
    v = vars[var]
    if len(v["dims"]) != 2:
        raise ValueError(f"variable {var!r} is not 2-D")
    ydim, xdim = v["dims"]

    def coord(dimid: int) -> np.ndarray:
        nm = dim_names[dimid]
        cv = vars.get(nm)
        if cv is None or cv["dims"] != [dimid]:
            # no coordinate variable: pixel-index georeferencing
            return np.arange(dims[dimid][1], dtype=np.float64) + 0.5
        return _read_var(data, dims, cv).astype(np.float64)

    ys = coord(ydim)
    xs = coord(xdim)
    if len(xs) < 2 or len(ys) < 2:
        raise ValueError("degenerate raster (needs >= 2 cells per axis)")

    arr = _read_var(data, dims, v).astype(np.float64)

    atts = v["atts"]
    fill = atts.get("_FillValue", atts.get("missing_value"))
    if fill is not None:
        arr[arr == float(np.asarray(fill).ravel()[0])] = np.nan
    scale = atts.get("scale_factor")
    offset = atts.get("add_offset")
    if scale is not None:
        arr = arr * float(np.asarray(scale).ravel()[0])
    if offset is not None:
        arr = arr + float(np.asarray(offset).ravel()[0])

    dx = float(xs[1] - xs[0])
    dy = float(ys[1] - ys[0])
    if dy > 0:  # ascending latitude -> flip to row-0-north
        arr = arr[::-1]
        ys = ys[::-1]
        dy = -dy
    xmin = float(xs[0]) - dx / 2.0
    ymax = float(ys[0]) - dy / 2.0  # dy negative: center + half-cell up
    h, w = arr.shape
    grid = Grid(xmin, ymax + h * dy, xmin + w * dx, ymax, dx, -dy)
    return np.ascontiguousarray(arr), grid


class NetCdfRasterFile:
    """Lazy NetCDF raster: header-only parse up front, per-window byte-range
    row reads after — the GeoTiffFile access pattern (geotiff.py:220), which
    is what makes the source 100-TB-streamable: the classic format stores
    the 2-D variable as one contiguous big-endian row-major block, so a
    (row, col) window is pure offset arithmetic and each worker touches
    only its own tiles' bytes.

    Window decode replays :func:`read_netcdf_raster`'s value pipeline in
    the same order (float64 cast -> _FillValue compare -> *scale_factor ->
    +add_offset -> orientation flip), so both paths are bit-identical."""

    def __init__(self, path: str, var: str | None = None):
        self.path = path
        self._f = open(path, "rb")
        # grow-on-truncation header parse: classic headers are tiny, but
        # nothing in the spec bounds them
        size = 1 << 16
        while True:
            self._f.seek(0)
            data = self._f.read(size)
            try:
                _numrecs, dims, _g, vars_ = _parse_header(data)
                break
            except (struct.error, ValueError, IndexError):
                if len(data) < size:  # whole file read and still failing
                    raise
                size *= 4
        dim_names = [d[0] for d in dims]
        if var is None:
            var = next(
                (nm for nm, v in vars_.items()
                 if len(v["dims"]) == 2 and nm not in dim_names),
                None,
            )
            if var is None:
                raise ValueError("no 2-D data variable found")
        v = vars_[var]
        if len(v["dims"]) != 2:
            raise ValueError(f"variable {var!r} is not 2-D")
        self.var = var
        ydim, xdim = v["dims"]
        self.nrow = dims[ydim][1]
        self.ncol = dims[xdim][1]

        def coord(dimid: int) -> np.ndarray:
            nm = dim_names[dimid]
            cv = vars_.get(nm)
            if cv is None or cv["dims"] != [dimid]:
                return np.arange(dims[dimid][1], dtype=np.float64) + 0.5
            fmt, esz = _NC_TYPES[cv["type"]]
            n = dims[dimid][1]
            self._f.seek(cv["begin"])
            return np.frombuffer(
                self._f.read(n * esz),
                dtype=np.int8 if esz == 1 else fmt,
            ).astype(np.float64)

        ys, xs = coord(ydim), coord(xdim)
        if len(xs) < 2 or len(ys) < 2:
            raise ValueError("degenerate raster (needs >= 2 cells per axis)")
        atts = v["atts"]
        fill = atts.get("_FillValue", atts.get("missing_value"))
        self._fill = None if fill is None else float(np.asarray(fill).ravel()[0])
        sc = atts.get("scale_factor")
        of = atts.get("add_offset")
        self._scale = None if sc is None else float(np.asarray(sc).ravel()[0])
        self._offset = None if of is None else float(np.asarray(of).ravel()[0])
        fmt, esz = _NC_TYPES[v["type"]]
        self._dtype = np.dtype(np.int8) if esz == 1 else np.dtype(fmt)
        self._esize = esz
        self._begin = v["begin"]
        dx = float(xs[1] - xs[0])
        dy = float(ys[1] - ys[0])
        self._y_ascending = dy > 0
        if self._y_ascending:
            ys = ys[::-1]
            dy = -dy
        xmin = float(xs[0]) - dx / 2.0
        ymax = float(ys[0]) - dy / 2.0
        self.grid = Grid(
            xmin, ymax + self.nrow * dy, xmin + self.ncol * dx, ymax, dx, -dy
        )

    def read_window(self, row0: int, col0: int, h: int, w: int) -> np.ndarray:
        """Decoded float64 window in ENGINE orientation (row 0 = north);
        south-up files are flipped at the row-offset level, so only the
        window's own bytes ever move."""
        out = np.empty((h, w), dtype=self._dtype)
        for i in range(h):
            r_eng = row0 + i
            r_file = (self.nrow - 1 - r_eng) if self._y_ascending else r_eng
            self._f.seek(self._begin + (r_file * self.ncol + col0) * self._esize)
            out[i] = np.frombuffer(
                self._f.read(w * self._esize), dtype=self._dtype
            )
        vals = out.astype(np.float64)
        if self._fill is not None:
            vals[vals == self._fill] = np.nan
        if self._scale is not None:
            vals = vals * self._scale
        if self._offset is not None:
            vals = vals + self._offset
        return vals

    def close(self) -> None:
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


class _NetCdfTileStage:
    """Actor stage: tile-id batches -> tile rows; each worker holds its own
    lazy NetCdfRasterFile and range-reads only its tiles' rows."""

    def __init__(self, path: str, var: str | None, tile: int):
        self.nf = NetCdfRasterFile(path, var=var)
        self.tile = tile

    def __call__(self, batch):
        ids = batch.column("id").to_numpy()

        def read(rr, cc):
            return self.nf.read_window(
                int(rr[0, 0]), int(cc[0, 0]), rr.shape[0], rr.shape[1]
            )

        from .raster import tile_batch

        return tile_batch(
            self.nf.grid, self.tile, self.tile, ids, {"value": read},
            dtype=np.float64,
        )


def netcdf_raster_dataset(path: str, var: str | None = None, tile: int = 256,
                          concurrency=(1, 8)):
    """NetCDF raster -> streaming tile Dataset (geotiff_raster_dataset's
    twin): the driver parses only the header; value rows are byte-range
    read and decoded inside the actor pool, so any-size grids stream
    without ever materializing on one node."""
    import ray

    from .raster import RasterDataset

    with NetCdfRasterFile(path, var=var) as nf:
        grid = nf.grid
    tiles_x = (grid.ncol + tile - 1) // tile
    tiles_y = (grid.nrow + tile - 1) // tile
    num_tiles = tiles_x * tiles_y
    try:
        ncpu = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        ncpu = 8
    blocks = max(1, min(num_tiles, 4 * ncpu))
    ids = ray.data.range(num_tiles, override_num_blocks=blocks)
    ds = ids.map_batches(
        _NetCdfTileStage,
        fn_constructor_args=(path, var, tile),
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    return RasterDataset(ds=ds, grid=grid, tile_h=tile, tile_w=tile,
                         layers=["value"])


def write_netcdf_raster(
    arr: np.ndarray,
    grid: Grid,
    path: str,
    var: str = "Band1",
    nodata: float | None = None,
    scale_factor: float | None = None,
    add_offset: float | None = None,
    dtype: str = "f8",
    y_ascending: bool = False,
    version: int = 1,
) -> None:
    """Single-variable CDF-1 raster writer (fixtures + GDAL-netCDF-sink
    analog). Writes y / x coordinate variables at cell centers (north-down
    by default; ``y_ascending=True`` stores CF-style south-up rows — the
    reader normalizes either), the 2-D data variable, and optional
    _FillValue / CF packing attributes. ``version=2`` emits the CDF-2
    (64-bit offset) container. Round-trips through
    :func:`read_netcdf_raster` (tested)."""
    a = np.asarray(arr, dtype=np.float64)
    h, w = a.shape
    if nodata is not None:
        a = np.where(np.isnan(a), nodata, a)
    if add_offset is not None:
        a = a - add_offset
    if scale_factor is not None:
        a = a / scale_factor
    nc_type, np_dt = {"f8": (6, ">f8"), "f4": (5, ">f4"), "i4": (4, ">i4"),
                      "i2": (3, ">i2")}[dtype]
    if nc_type in (3, 4):
        a = np.round(a)

    ys = grid.ymax - grid.dy * (np.arange(h, dtype=np.float64) + 0.5)
    xs = grid.xmin + grid.dx * (np.arange(w, dtype=np.float64) + 0.5)
    if y_ascending:
        ys = ys[::-1]
        a = a[::-1]

    def pad4(b: bytes) -> bytes:
        return b + b"\x00" * ((4 - len(b) % 4) % 4)

    def nc_string(s: str) -> bytes:
        e = s.encode()
        return struct.pack(">I", len(e)) + pad4(e)

    def att_list(items) -> bytes:
        if not items:
            return struct.pack(">II", 0, 0)
        b = struct.pack(">II", _NC_ATTRIBUTE, len(items))
        for nm, typ, vals in items:
            raw = np.asarray(vals, dtype=_NC_TYPES[typ][0]).tobytes()
            b += nc_string(nm) + struct.pack(">II", typ, len(np.atleast_1d(vals)))
            b += pad4(raw)
        return b

    if version not in (1, 2):
        raise ValueError("version must be 1 (CDF-1) or 2 (CDF-2)")
    header = bytes([0x43, 0x44, 0x46, version]) + struct.pack(">I", 0)
    header += struct.pack(">II", _NC_DIMENSION, 2)
    header += nc_string("y") + struct.pack(">I", h)
    header += nc_string("x") + struct.pack(">I", w)
    header += struct.pack(">II", 0, 0)  # no global attributes

    band_atts = []
    if nodata is not None:
        band_atts.append(("_FillValue", nc_type,
                          [nodata if scale_factor is None and add_offset is None
                           else (nodata - (add_offset or 0.0))
                           / (scale_factor or 1.0)]))
    if scale_factor is not None:
        band_atts.append(("scale_factor", 6, [scale_factor]))
    if add_offset is not None:
        band_atts.append(("add_offset", 6, [add_offset]))

    esz = _NC_TYPES[nc_type][1]
    vs_band = h * w * esz
    vs_band += (4 - vs_band % 4) % 4
    entries = [
        ("y", [0], [], 6, h * 8),
        ("x", [1], [], 6, w * 8),
        (var, [0, 1], band_atts, nc_type, vs_band),
    ]

    begin_fmt = ">Q" if version == 2 else ">I"

    def var_header(nm, dimids, atts, typ, vsize, begin):
        b = nc_string(nm) + struct.pack(">I", len(dimids))
        for d in dimids:
            b += struct.pack(">I", d)
        b += att_list(atts)
        b += struct.pack(">II", typ, vsize) + struct.pack(begin_fmt, begin)
        return b

    hlen = len(header) + 8
    for nm, dimids, atts, typ, vsize in entries:
        hlen += len(var_header(nm, dimids, atts, typ, vsize, 0))
    body = struct.pack(">II", _NC_VARIABLE, len(entries))
    begin = hlen
    payloads = []
    for nm, dimids, atts, typ, vsize in entries:
        body += var_header(nm, dimids, atts, typ, vsize, begin)
        if nm == "y":
            raw = ys.astype(">f8").tobytes()
        elif nm == "x":
            raw = xs.astype(">f8").tobytes()
        else:
            raw = a.astype(np_dt).tobytes()
        payloads.append(raw + b"\x00" * ((4 - len(raw) % 4) % 4))
        begin += vsize
    with open(path, "wb") as f:
        f.write(header + body)
        for p in payloads:
            f.write(p)
