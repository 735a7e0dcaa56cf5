"""Pure-Python GeoTIFF ingestion (no GDAL in this environment).

The reference's raster source is a GDAL band wrapper
(/root/reference/src/exactextract/src/gdal_raster_wrapper.cpp:22-95); this
module is its ingestion analog for the subset of GeoTIFF every real-world
test asset in the reference uses (and the common wild formats): baseline
TIFF and BigTIFF containers, little/big endian, strip- or tile-organized,
compression none / Deflate (zlib) / PackBits / LZW / ZSTD (code 50000,
via pyarrow's codec), COG-style reduced-resolution overview IFD chains
(``read_geotiff(overview=k)`` / ``list_overviews``), horizontal-differencing
predictor 2 and floating-point predictor 3 (TIFF Technical Note 3),
uint8/16/32, int8/16/32, float32/64, ModelPixelScale + ModelTiepoint
georeferencing, and GDAL's ASCII NODATA tag.

Scale contract: ``GeoTiffFile`` is a LAZY range-read handle — header and
IFD chain are parsed with targeted seeks (a few KB), and
``read_window``/``read_tiles`` fetch only the byte ranges of intersecting
chunks, which is exactly the COG access pattern GDAL performs over object
storage. ``read_geotiff`` (whole raster in memory, built on the same
window path) remains for the reference's test assets, all < 100 MB.
``geotiff_raster_dataset`` streams tiles through an actor pool whose
workers each hold their own ``GeoTiffFile`` and read only their tiles'
ranges — no driver materialization; ``geotiff_to_tile_parquet`` converts
to the engine's native tile-parquet layout on top of it.

Validated against the reference's own assets: the sao_miguel population
vignette reconciliation (vignettes/vig1_population.Rmd:186-189,
``stopifnot(missing_pop_pct < 1)``) passes end-to-end in
tests/test_geotiff.py.
"""

from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass

import numpy as np

from ..grid import Grid

# TIFF tag ids
_TAGS = {
    "width": 256,
    "height": 257,
    "bits_per_sample": 258,
    "compression": 259,
    "strip_offsets": 273,
    "samples_per_pixel": 277,
    "rows_per_strip": 278,
    "strip_byte_counts": 279,
    "predictor": 317,
    "planar_config": 284,
    "tile_width": 322,
    "tile_length": 323,
    "tile_offsets": 324,
    "tile_byte_counts": 325,
    "sample_format": 339,
    "jpeg_tables": 347,
    "model_pixel_scale": 33550,
    "model_tiepoint": 33922,
    "gdal_nodata": 42113,
}

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8,
              11: 4, 12: 8, 16: 8, 17: 8, 18: 8}
_TYPE_FMT = {1: "B", 2: "s", 3: "H", 4: "I", 6: "b", 7: "B", 8: "h", 9: "i",
             11: "f", 12: "d", 16: "Q", 17: "q", 18: "Q"}


@dataclass
class GeoTiffMeta:
    width: int
    height: int
    dtype: np.dtype
    nodata: float | None
    grid: Grid


def _read_ifd(
    data, endian: str, off: int, big: bool = False
) -> tuple[dict, int]:
    """Classic-TIFF (12-byte entries, u32 offsets) or BigTIFF (20-byte
    entries, u64 counts/offsets — the public BigTIFF spec) IFD. Returns
    (tags, next_ifd_offset) — a nonzero next offset chains to the file's
    next IFD (GDAL stores overviews as reduced-resolution chained IFDs).
    Range-read friendly: the entry block is one read; each out-of-line
    value is one more."""
    src = _as_src(data)
    if big:
        n = struct.unpack(endian + "Q", src.get(off, 8))[0]
        ebase, esize, inline = off + 8, 20, 8
    else:
        n = struct.unpack(endian + "H", src.get(off, 2))[0]
        ebase, esize, inline = off + 2, 12, 4
    block = src.get(ebase, n * esize + (8 if big else 4))
    tags = {}
    for i in range(n):
        e = block[i * esize : (i + 1) * esize]
        if big:
            tag, typ, cnt = struct.unpack(endian + "HHQ", e[:12])
        else:
            tag, typ, cnt = struct.unpack(endian + "HHI", e[:8])
        size = _TYPE_SIZE.get(typ)
        if size is None:
            continue
        total = size * cnt
        vfield = e[esize - inline : esize]
        raw = vfield if total <= inline else None
        if raw is None:
            o = struct.unpack(endian + ("Q" if big else "I"), vfield)[0]
            raw = src.get(o, total)
        if typ == 2:  # ASCII
            tags[tag] = raw[:cnt].rstrip(b"\x00").decode("ascii", "replace")
        elif typ == 5:  # RATIONAL
            vals = struct.unpack(endian + "II" * cnt, raw[: 8 * cnt])
            tags[tag] = tuple(
                vals[2 * k] / vals[2 * k + 1] for k in range(cnt)
            )
        else:
            fmt = _TYPE_FMT[typ]
            tags[tag] = struct.unpack(endian + fmt * cnt, raw[: size * cnt])
    tail = block[n * esize:]
    if big:
        (nxt,) = struct.unpack(endian + "Q", tail[:8])
    else:
        (nxt,) = struct.unpack(endian + "I", tail[:4])
    return tags, nxt


def _decode_lzw(data: bytes) -> bytes:
    """TIFF LZW (MSB-first bit packing, early-change), public spec
    (TIFF 6.0 §13)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    table: list[bytes] = []

    def reset():
        nonlocal table
        table = [bytes([i]) for i in range(256)] + [b"", b""]

    reset()
    bits = 0
    acc = 0
    width = 9
    prev: bytes | None = None
    for byte in data:
        acc = (acc << 8) | byte
        bits += 8
        while bits >= width:
            code = (acc >> (bits - width)) & ((1 << width) - 1)
            bits -= width
            if code == CLEAR:
                reset()
                width = 9
                prev = None
                continue
            if code == EOI:
                return bytes(out)
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            else:
                entry = prev + prev[:1]
                table.append(entry)
            out.extend(entry)
            prev = entry
            # early change, decoder side: the decoder's table lags the
            # encoder's by ONE pending entry, so it must widen one entry
            # earlier (at 2^w - 2, not 2^w - 1)
            if len(table) >= (1 << width) - 2 and width < 12:
                width += 1
    return bytes(out)


def _decode_packbits(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data):
        n = data[i]
        i += 1
        if n < 128:
            out.extend(data[i : i + n + 1])
            i += n + 1
        elif n > 128:
            out.extend(data[i : i + 1] * (257 - n))
            i += 1
    return bytes(out)


def _decompress(chunk: bytes, compression: int, out_size: int = 0,
                jpeg_tables: bytes | None = None) -> bytes:
    if compression == 1:
        return chunk
    if compression in (8, 32946):  # Deflate (zlib)
        return zlib.decompress(chunk)
    if compression == 5:
        return _decode_lzw(chunk)
    if compression == 32773:
        return _decode_packbits(chunk)
    if compression == 50000:  # ZSTD (GDAL/registered TIFF code)
        import pyarrow as _pa

        return bytes(_pa.Codec("zstd").decompress(chunk, out_size))
    if compression == 7:  # JPEG ('new-style', TIFF Technote 2): each chunk
        # is a JPEG stream, abbreviated when a JPEGTables tag supplies the
        # shared DQT/DHT. Decoded pixels re-enter the normal chunk path as
        # chunky-interleaved uint8 bytes.
        from ..functions.jpeg import decode_jpeg

        return decode_jpeg(chunk, tables=jpeg_tables).tobytes()
    if compression == 6:
        raise NotImplementedError(
            "old-style TIFF JPEG (compression 6) is deprecated by TIFF "
            "Technote 2 and unsupported; re-save with compression 7"
        )
    raise ValueError(f"unsupported TIFF compression {compression}")


def _undo_predictor2(block: np.ndarray, dt: np.dtype, bps: int,
                     endian: str) -> np.ndarray:
    """Horizontal differencing (TIFF predictor 2): value-level modular
    cumsum over each row, two's-complement-safe via the unsigned view."""
    un_file = np.dtype(f"{endian}u{bps // 8}")
    un_native = np.dtype(f"u{bps // 8}")
    rec = np.cumsum(block.view(un_file), axis=1, dtype=np.uint64).astype(
        un_native
    )
    return rec.view(np.dtype(f"{dt.kind}{bps // 8}"))


def _undo_predictor3(raw: bytes, rows: int, cols: int, bps: int) -> np.ndarray:
    """Floating-point predictor (TIFF Technical Note 3, predictor 3): the
    encoder splits each row's values into byte planes (most significant
    first, endian-independent), then byte-level horizontal differencing.
    Decode = byte cumsum per row, then re-interleave planes into big-endian
    values. Fully vectorized."""
    s = bps // 8
    b = np.frombuffer(raw, np.uint8, count=rows * cols * s).reshape(
        rows, cols * s
    )
    b = np.cumsum(b, axis=1, dtype=np.uint64).astype(np.uint8)
    planes = b.reshape(rows, s, cols)  # (row, byte-plane, col)
    be = np.transpose(planes, (0, 2, 1)).reshape(rows, cols, s)
    return (
        np.frombuffer(np.ascontiguousarray(be).tobytes(), dtype=f">f{s}")
        .reshape(rows, cols)
    )


def _np_dtype(bps: int, fmt: int, endian: str) -> np.dtype:
    kind = {1: "u", 2: "i", 3: "f"}.get(fmt, "u")
    return np.dtype(f"{endian}{kind}{bps // 8}")


class _Src:
    """Byte-range source: wraps either in-memory bytes or an open binary
    file. ``get(off, size)`` is the ONLY access primitive, so every parse
    and chunk fetch is an explicit range read — the COG access pattern
    (over object storage these become HTTP range requests)."""

    __slots__ = ("_data", "_f")

    def __init__(self, obj):
        if isinstance(obj, (bytes, bytearray, memoryview)):
            self._data, self._f = bytes(obj), None
        else:
            self._data, self._f = None, obj

    def get(self, off: int, size: int) -> bytes:
        if self._data is not None:
            return self._data[off:off + size]
        self._f.seek(off)
        return self._f.read(size)


def _as_src(data) -> _Src:
    return data if isinstance(data, _Src) else _Src(data)


def _tiff_header(data) -> tuple[str, bool, int]:
    """Parse the TIFF/BigTIFF header -> (endian, is_bigtiff, first_ifd_off)."""
    src = _as_src(data)
    head = src.get(0, 16)
    if head[:2] == b"II":
        endian = "<"
    elif head[:2] == b"MM":
        endian = ">"
    else:
        raise ValueError("not a TIFF file")
    (magic,) = struct.unpack(endian + "H", head[2:4])
    if magic == 42:  # classic TIFF
        big = False
        (ifd_off,) = struct.unpack(endian + "I", head[4:8])
    elif magic == 43:  # BigTIFF
        big = True
        osize, zero, ifd_off = struct.unpack(endian + "HHQ", head[4:16])
        if osize != 8 or zero != 0:
            raise ValueError("malformed BigTIFF header")
    else:
        raise ValueError(f"unknown TIFF magic {magic}")
    return endian, big, ifd_off


def _ifd_chain(data, endian: str, big: bool, first: int) -> list[dict]:
    """All IFDs in file order; [0] is the full-resolution band, the rest
    are overviews/masks (GDAL overview layout: chained reduced-res IFDs)."""
    src = _as_src(data)
    out = []
    off = first
    seen = set()
    while off and off not in seen:
        seen.add(off)
        t, off = _read_ifd(src, endian, off, big=big)
        out.append(t)
    return out


def list_overviews(path: str) -> list[tuple[int, int]]:
    """(width, height) of each reduced-resolution IFD (NewSubfileType bit
    0x1), in file order — GDAL/COG overview discovery."""
    with open(path, "rb") as f:
        data = f.read()
    endian, big, first = _tiff_header(data)
    chain = _ifd_chain(data, endian, big, first)
    return [
        (t[_TAGS["width"]][0], t[_TAGS["height"]][0])
        for t in chain[1:]
        if t.get(254, (0,))[0] & 0x1
    ]


class GeoTiffFile:
    """Lazy range-read GeoTIFF handle (the COG access pattern).

    ``__init__`` parses only the header + IFD chain (a few KB of targeted
    reads); ``read_window``/``read_tiles`` decode only the chunks that
    intersect the request. Over object storage these ``_Src.get`` calls
    are exactly GDAL's ``/vsicurl`` range requests
    (gdal_raster_wrapper.cpp:22-95 gets this from GDAL for free).

    ``band`` is 1-based like GDAL's band index; both PlanarConfiguration
    layouts are handled (1 chunky, 2 planar). Windows come back float64
    with nodata as NaN — the engine's cell contract.
    """

    def __init__(self, path: str, band: int = 1,
                 overview: int | None = None):
        self._f = open(path, "rb")
        src = self._src = _Src(self._f)
        endian, big, ifd_off = _tiff_header(src)
        chain = _ifd_chain(src, endian, big, ifd_off)
        t0 = chain[0]
        if overview is None:
            t = t0
        else:
            ovs = [c for c in chain[1:] if c.get(254, (0,))[0] & 0x1]
            if not 0 <= overview < len(ovs):
                raise ValueError(
                    f"overview {overview} out of range ({len(ovs)} available)"
                )
            t = ovs[overview]

        self.width = t[_TAGS["width"]][0]
        self.height = t[_TAGS["height"]][0]
        self._bps = t.get(_TAGS["bits_per_sample"], (8,))[0]
        spp = t.get(_TAGS["samples_per_pixel"], (1,))[0]
        fmt = t.get(_TAGS["sample_format"], (1,))[0]
        self._comp = t.get(_TAGS["compression"], (1,))[0]
        self._predictor = t.get(_TAGS["predictor"], (1,))[0]
        planar = t.get(_TAGS["planar_config"], (1,))[0]
        if not 1 <= band <= spp:
            raise ValueError(f"band {band} out of range (file has {spp})")
        self._band = band
        self._planar = planar
        self._dt = _np_dtype(self._bps, fmt, endian)
        self._nsamp = spp if planar == 1 else 1
        jt = t.get(_TAGS["jpeg_tables"], t0.get(_TAGS["jpeg_tables"]))
        self._jpeg_tables = bytes(jt) if jt is not None else None

        if _TAGS["tile_offsets"] in t:
            self._tiled = True
            self._ctw = t[_TAGS["tile_width"]][0]
            self._ctl = t[_TAGS["tile_length"]][0]
            offs = t[_TAGS["tile_offsets"]]
            cnts = t[_TAGS["tile_byte_counts"]]
        else:
            self._tiled = False
            self._ctw = self.width
            self._ctl = t.get(_TAGS["rows_per_strip"], (self.height,))[0]
            offs = t[_TAGS["strip_offsets"]]
            cnts = t[_TAGS["strip_byte_counts"]]
        if planar == 2:  # per-plane chunk groups; keep only this band's
            cpp = len(offs) // spp
            offs = offs[(band - 1) * cpp : band * cpp]
            cnts = cnts[(band - 1) * cpp : band * cpp]
        self._offs, self._cnts = offs, cnts
        self._chunks_x = (self.width + self._ctw - 1) // self._ctw
        self._chunks_y = (self.height + self._ctl - 1) // self._ctl

        # georeferencing always from the FULL-RESOLUTION IFD (overview IFDs
        # carry no geo tags); an overview keeps the full extent at its own
        # coarser cell size
        sx, sy = t0[_TAGS["model_pixel_scale"]][:2]
        ti, tj, _tk, tx0, ty0, _tz = t0[_TAGS["model_tiepoint"]][:6]
        xmin = tx0 - ti * sx
        ymax = ty0 + tj * sy
        full_w = t0[_TAGS["width"]][0]
        full_h = t0[_TAGS["height"]][0]
        ext_x, ext_y = full_w * sx, full_h * sy
        self.grid = Grid(
            xmin, ymax - ext_y, xmin + ext_x, ymax,
            ext_x / self.width, ext_y / self.height,
        )
        self.nodata = None
        nd = t.get(_TAGS["gdal_nodata"], t0.get(_TAGS["gdal_nodata"]))
        if nd is not None:
            try:
                self.nodata = float(nd.strip())
            except (ValueError, AttributeError):
                self.nodata = None
        self.meta = GeoTiffMeta(
            self.width, self.height, np.dtype(self._dt.base), self.nodata,
            self.grid,
        )

    # -- context / lifecycle --
    def close(self):
        if self._f is not None:
            self._f.close()
            self._f = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def _chunk(self, cy: int, cx: int) -> np.ndarray:
        """Decode chunk (cy, cx) -> (rows, cols, nsamp) in file dtype."""
        k = cy * self._chunks_x + cx
        raw = self._src.get(self._offs[k], self._cnts[k])
        rows, cols = self._ctl, self._ctw
        if not self._tiled:
            rows = min(self._ctl, self.height - cy * self._ctl)
        body = _decompress(raw, self._comp, rows * cols * self._nsamp
                           * (self._bps // 8), jpeg_tables=self._jpeg_tables)
        if self._predictor == 3:
            block = _undo_predictor3(body, rows, cols * self._nsamp,
                                     self._bps)
            return block.reshape(rows, cols, self._nsamp)
        block = np.frombuffer(
            body, dtype=self._dt, count=rows * cols * self._nsamp
        ).reshape(rows, cols, self._nsamp)
        if self._predictor == 2:
            block = _undo_predictor2(block, self._dt, self._bps, "<"
                                     if self._dt.byteorder != ">" else ">")
        return block

    def read_window(self, row0: int, col0: int, h: int, w: int) -> np.ndarray:
        """(h, w) float64 window with nodata -> NaN; reads only the
        intersecting chunks' byte ranges."""
        if not (0 <= row0 and 0 <= col0 and row0 + h <= self.height
                and col0 + w <= self.width):
            raise ValueError("window out of raster bounds")
        arr = np.empty((h, w), dtype=self._dt.newbyteorder("="))
        ch = self._band - 1 if self._planar == 1 else 0
        cy0, cy1 = row0 // self._ctl, (row0 + h - 1) // self._ctl
        cx0, cx1 = col0 // self._ctw, (col0 + w - 1) // self._ctw
        for cy in range(cy0, cy1 + 1):
            for cx in range(cx0, cx1 + 1):
                block = self._chunk(cy, cx)[:, :, ch]
                r_lo = max(row0, cy * self._ctl)
                r_hi = min(row0 + h, cy * self._ctl + block.shape[0],
                           self.height)
                c_lo = max(col0, cx * self._ctw)
                c_hi = min(col0 + w, cx * self._ctw + block.shape[1],
                           self.width)
                arr[r_lo - row0:r_hi - row0, c_lo - col0:c_hi - col0] = (
                    block[r_lo - cy * self._ctl:r_hi - cy * self._ctl,
                          c_lo - cx * self._ctw:c_hi - cx * self._ctw]
                )
        out = arr.astype(np.float64)
        if self.nodata is not None and not np.isnan(self.nodata):
            out[arr == arr.dtype.type(self.nodata)] = np.nan
        return out


def read_geotiff(
    path: str, overview: int | None = None, band: int = 1
) -> tuple[np.ndarray, GeoTiffMeta]:
    """Read one band of a GeoTIFF into (float64 array with NaN nodata,
    meta) — the whole-raster convenience built on GeoTiffFile's window
    path (reference test assets are all < 100 MB; big rasters should use
    GeoTiffFile windows or geotiff_raster_dataset streaming)."""
    with GeoTiffFile(path, band=band, overview=overview) as gf:
        return gf.read_window(0, 0, gf.height, gf.width), gf.meta


class _GeoTiffTileStage:
    """Actor stage: tile-id batches -> tile rows, each worker holding its
    own lazy GeoTiffFile and range-reading only its tiles' chunks."""

    def __init__(self, path: str, band: int, tile: int,
                 overview: int | None = None):
        self.gf = GeoTiffFile(path, band=band, overview=overview)
        self.tile = tile

    def __call__(self, batch):
        ids = batch.column("id").to_numpy()

        def read(rr, cc):
            return self.gf.read_window(
                int(rr[0, 0]), int(cc[0, 0]), rr.shape[0], rr.shape[1]
            )

        from .raster import tile_batch

        return tile_batch(
            self.gf.grid, self.tile, self.tile, ids, {"value": read},
            dtype=np.float64,
        )


def geotiff_raster_dataset(path: str, tile: int = 256, band: int = 1,
                           overview: int | None = None,
                           concurrency=(1, 8)):
    """GeoTIFF -> streaming tile Dataset (the engine's native form).

    The driver only parses the header (grid + dims) and enumerates tile
    ids; value blocks are range-read and decoded inside the actor pool, so
    a raster of any size streams without ever materializing on one node."""
    import ray

    from .raster import RasterDataset

    with GeoTiffFile(path, band=band, overview=overview) as gf:
        grid = gf.grid
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
        _GeoTiffTileStage,
        fn_constructor_args=(path, band, tile, overview),
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    return RasterDataset(ds=ds, grid=grid, tile_h=tile, tile_w=tile,
                         layers=["value"])



def geotiff_to_tile_parquet(path: str, out_dir: str, tile: int = 256) -> None:
    """GeoTIFF -> tile-parquet + grid sidecar (resumable ingestion unit)."""
    from .raster import write_raster_parquet

    write_raster_parquet(geotiff_raster_dataset(path, tile), out_dir)


# ---------------- GeoTIFF writer (raster result sink) ----------------

_FMT_CODE = {"u": 1, "i": 2, "f": 3}


def _compress_body(body: bytes, compression: int) -> bytes:
    if compression == 1:
        return body
    if compression == 8:
        return zlib.compress(body)
    if compression == 50000:  # ZSTD
        import pyarrow as _pa

        return bytes(_pa.Codec("zstd").compress(body))
    raise ValueError(
        "writer supports compression 1 (none), 7 (jpeg, uint8 only), "
        "8 (deflate), 50000 (zstd)"
    )


def _jpeg_chunk(body: bytes, rows: int, cols: int, nb: int,
                quality: int, subsampling: str = "4:4:4") -> bytes:
    """One raw chunky chunk -> abbreviated JPEG stream (Technote 2: the
    shared DQT/DHT ride in the JPEGTables tag)."""
    from ..functions.jpeg import encode_jpeg

    a = np.frombuffer(body, np.uint8, count=rows * cols * nb).reshape(
        rows, cols, nb
    )
    img = a[:, :, 0] if nb == 1 else a
    return encode_jpeg(img, quality=quality, subsampling=subsampling,
                       include_tables=False)


def _apply_predictor(body: bytes, rows: int, cols: int, nb: int,
                     dt: np.dtype, predictor: int) -> bytes:
    """Encode-side TIFF predictors over one raw chunky chunk: 2 =
    per-component horizontal differencing (ints), 3 = TechNote-3
    byte-plane differencing (floats)."""
    if predictor == 2:
        u = (
            np.frombuffer(body, dtype=dt.newbyteorder("<"))
            .reshape(rows, cols, nb)
            .view(np.dtype(f"<u{dt.itemsize}"))
            .astype(np.int64)
        )
        d = np.concatenate([u[:, :1], np.diff(u, axis=1)], axis=1)
        return (
            (d % (1 << (8 * dt.itemsize)))
            .astype(np.dtype(f"<u{dt.itemsize}"))
            .tobytes()
        )
    if predictor == 3:
        sz = dt.itemsize
        be = np.frombuffer(
            np.frombuffer(body, dtype=dt.newbyteorder("<"))
            .astype(f">f{sz}")
            .tobytes(),
            np.uint8,
        ).reshape(rows, cols * nb, sz)
        planes = np.transpose(be, (0, 2, 1)).reshape(rows, cols * nb * sz)
        d = np.concatenate(
            [planes[:, :1].astype(np.int64),
             np.diff(planes.astype(np.int64), axis=1)],
            axis=1,
        )
        return (d % 256).astype(np.uint8).tobytes()
    raise ValueError(f"unsupported write predictor {predictor}")


def write_geotiff(
    arr: np.ndarray,
    grid: Grid,
    path: str,
    nodata: float | None = None,
    compression: int = 8,
    overviews: list[int] | None = None,
    planar: int = 1,
    tile: int | None = None,
    jpeg_quality: int = 90,
    jpeg_subsampling: str = "4:4:4",
    predictor: int = 1,
) -> None:
    """GeoTIFF writer (pure struct, classic little-endian container,
    Deflate by default; ZSTD via code 50000) — the raster-output sink the
    reference gets from GDAL (rasterize / resample results become
    real-world rasters). NaNs are written as ``nodata`` when given.
    ``overviews=[2, 4, ...]`` appends COG-style reduced-resolution IFDs
    (NewSubfileType=1) built by 2x2-block striding (deterministic
    decimation). ``tile=256`` switches from strip to tile organization —
    with overviews + ZSTD this produces a cloud-optimized layout whose
    chunks are independently range-readable. Round-trips bit-exactly
    through :func:`read_geotiff` (tested), overviews via ``overview=k``.
    ``compression=7`` writes JPEG-in-TIFF (Technote 2: shared tables in a
    ``JPEGTables`` tag + abbreviated per-chunk streams; uint8, chunky, 1
    or 3 samples, LOSSY at ``jpeg_quality``; ``jpeg_subsampling="4:2:0"``
    writes chroma-subsampled YCbCr, the GDAL PHOTOMETRIC=YCBCR layout). ``predictor=2``
    (ints) / ``3`` (floats, TechNote 3) pre-differences rows before
    Deflate/ZSTD — the GDAL-default layout for smooth rasters."""
    import struct as _s

    a = np.asarray(arr)
    if a.dtype.kind not in _FMT_CODE:
        raise ValueError(f"unsupported dtype {a.dtype}")
    if nodata is not None and a.dtype.kind == "f":
        a = np.where(np.isnan(a), a.dtype.type(nodata), a)
    nb = a.shape[2] if a.ndim == 3 else 1  # pixel-interleaved multiband
    if compression == 7:
        if a.dtype != np.uint8:
            raise ValueError("JPEG-in-TIFF (compression 7) requires uint8")
        if planar != 1 or nb not in (1, 3):
            raise ValueError(
                "JPEG-in-TIFF supports chunky 1- or 3-sample pixels only"
            )
        if jpeg_subsampling not in ("4:4:4", "4:2:0"):
            raise ValueError("jpeg_subsampling must be 4:4:4 or 4:2:0")
        if nb == 1:
            jpeg_subsampling = "4:4:4"  # grayscale has no chroma
    if predictor not in (1, 2, 3):
        raise ValueError("predictor must be 1 (none), 2 (ints) or 3 (floats)")
    if predictor != 1:
        if compression == 7:
            raise ValueError("predictors do not apply to JPEG-in-TIFF")
        if planar != 1:
            raise NotImplementedError("predictor write requires chunky layout")
        if predictor == 2 and a.dtype.kind not in "ui":
            raise ValueError("predictor 2 is for integer samples")
        if predictor == 3 and a.dtype.kind != "f":
            raise ValueError("predictor 3 is for float samples")

    levels: list[tuple[np.ndarray, bool]] = [(a, False)]
    for f in overviews or []:
        levels.append((a[::f, ::f], True))

    def level_chunks(lv: np.ndarray) -> list[bytes]:
        """Raw (uncompressed) chunk payloads for one IFD: whole-image
        strips by default, or t x t tiles (edge tiles zero-padded per the
        TIFF spec) in tile organization; planar=2 groups chunks by plane."""
        dt = lv.dtype
        if lv.ndim == 2:
            lv = lv[:, :, None]
        planes = (
            [lv[:, :, p : p + 1] for p in range(nb)]
            if planar == 2 and nb > 1
            else [lv]
        )
        out = []
        for pl in planes:
            if tile is None:
                out.append(
                    np.ascontiguousarray(
                        pl, dtype=dt.newbyteorder("<")
                    ).tobytes()
                )
                continue
            h, w = pl.shape[:2]
            ph = (h + tile - 1) // tile * tile
            pw = (w + tile - 1) // tile * tile
            pad = np.zeros((ph, pw, pl.shape[2]), dtype=dt)
            pad[:h, :w] = pl
            for ty in range(ph // tile):
                for tx in range(pw // tile):
                    blk = pad[ty * tile : (ty + 1) * tile,
                              tx * tile : (tx + 1) * tile]
                    out.append(
                        np.ascontiguousarray(
                            blk, dtype=dt.newbyteorder("<")
                        ).tobytes()
                    )
        return out

    # pass 1: compressed bodies laid out right after the 8-byte header
    bodies: list[list[bytes]] = []
    off = 8
    body_offs: list[list[int]] = []
    for lv, _red in levels:
        raw_chunks = level_chunks(lv)
        ch = lv.shape[0] if tile is None else tile
        cw = lv.shape[1] if tile is None else tile
        if compression == 7:
            comp = [_jpeg_chunk(p, ch, cw, nb, jpeg_quality,
                                jpeg_subsampling)
                    for p in raw_chunks]
        else:
            if predictor != 1:
                raw_chunks = [
                    _apply_predictor(p, ch, cw, nb, a.dtype, predictor)
                    for p in raw_chunks
                ]
            comp = [_compress_body(p, compression) for p in raw_chunks]
        bodies.append(comp)
        offs = []
        for c in comp:
            offs.append(off)
            off += len(c)
        body_offs.append(offs)

    # pass 2: serialize each IFD (+ its out-of-line payload) in chain order
    ifd_blobs = []
    ifd_offs = []
    for i, (lv, reduced) in enumerate(levels):
        h, w = lv.shape[:2]
        dt = lv.dtype
        nchunks = len(bodies[i])
        photometric = 6 if (compression == 7 and nb == 3) else 1
        tags = [
            (256, 4, 1, w),
            (257, 4, 1, h),
            (259, 3, 1, compression),
            (262, 3, 1, photometric),
            (277, 3, 1, nb),
            (284, 3, 1, planar),
        ]
        if predictor != 1:
            tags.append((317, 3, 1, predictor))
        extra_items = []  # (tag, typ, cnt, payload bytes)
        if compression == 7:
            from ..functions.jpeg import encode_jpeg_tables

            jt = encode_jpeg_tables(gray=(nb == 1), quality=jpeg_quality)
            extra_items.append((347, 7, len(jt), jt))
            if nb == 3:  # YCbCrSubSampling matches the SOF factors
                sub = (2, 2) if jpeg_subsampling == "4:2:0" else (1, 1)
                extra_items.append((530, 3, 2, struct.pack("<2H", *sub)))
        if tile is None:
            tags.append((278, 4, 1, h))  # RowsPerStrip: whole image
            off_tag, cnt_tag = 273, 279
        else:
            tags.append((322, 4, 1, tile))  # TileWidth
            tags.append((323, 4, 1, tile))  # TileLength
            off_tag, cnt_tag = 324, 325
        extra_items.append(
            (off_tag, 4, nchunks, struct.pack(f"<{nchunks}I", *body_offs[i]))
        )
        extra_items.append(
            (cnt_tag, 4, nchunks,
             struct.pack(f"<{nchunks}I", *(len(b) for b in bodies[i])))
        )
        # per-sample SHORT arrays (inline when they fit in 4 bytes)
        extra_items.append(
            (258, 3, nb, struct.pack(f"<{nb}H", *([dt.itemsize * 8] * nb)))
        )
        extra_items.append(
            (339, 3, nb, struct.pack(f"<{nb}H", *([_FMT_CODE[dt.kind]] * nb)))
        )
        if reduced:
            tags.append((254, 4, 1, 1))  # NewSubfileType: reduced-resolution
        else:
            scale = _s.pack("<3d", grid.dx, grid.dy, 0.0)
            extra_items.append((33550, 12, 3, scale))
            tie = _s.pack("<6d", 0, 0, 0, grid.xmin, grid.ymax, 0.0)
            extra_items.append((33922, 12, 6, tie))
            if nodata is not None:
                nd = f"{nodata:.17g}".encode() + b"\x00"
                extra_items.append((42113, 2, len(nd), nd))

        n_entries = len(tags) + len(extra_items)
        ifd_offs.append(off)
        extra_off = off + 2 + 12 * n_entries + 4
        extra = b""
        for tag, typ, cnt, payload in extra_items:
            size = {2: 1, 3: 2, 4: 4, 7: 1, 12: 8}[typ] * cnt
            if size <= 4:
                tags.append(
                    (tag, typ, cnt,
                     int.from_bytes(payload.ljust(4, b"\x00"), "little"))
                )
            else:
                tags.append((tag, typ, cnt, extra_off + len(extra)))
                extra += payload

        blob = bytearray(_s.pack("<H", n_entries))
        for tag, typ, cnt, val in sorted(tags):
            blob += _s.pack("<HHI", tag, typ, cnt)
            blob += _s.pack("<I", val)
        blob += b"\x00\x00\x00\x00"  # next-IFD pointer patched below
        blob += extra
        ifd_blobs.append(blob)
        off += len(blob)

    out = bytearray(b"II" + _s.pack("<HI", 42, ifd_offs[0]))
    for level_bodies in bodies:
        for body in level_bodies:
            out += body
    for i, blob in enumerate(ifd_blobs):
        if i + 1 < len(ifd_blobs):
            (n_entries,) = _s.unpack("<H", bytes(blob[:2]))
            p = 2 + 12 * n_entries
            blob[p : p + 4] = _s.pack("<I", ifd_offs[i + 1])
        out += blob
    with open(path, "wb") as f:
        f.write(out)
