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

Scale contract: ``read_geotiff`` materializes one raster in memory (used for
the reference's test assets, all < 100 MB); ``geotiff_to_tile_parquet``
converts to the engine's native tile-parquet layout, after which everything
streams through Ray Data. For rasters too large for one machine, the
converter is the per-file unit of a ``map_batches`` over a file manifest —
each file (or strip range) converts independently.

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
    data: bytes, endian: str, off: int, big: bool = False
) -> tuple[dict, int]:
    """Classic-TIFF (12-byte entries, u32 offsets) or BigTIFF (20-byte
    entries, u64 counts/offsets — the public BigTIFF spec) IFD. Returns
    (tags, next_ifd_offset) — a nonzero next offset chains to the file's
    next IFD (GDAL stores overviews as reduced-resolution chained IFDs)."""
    if big:
        n = struct.unpack(endian + "Q", data[off : off + 8])[0]
        ebase, esize, inline = off + 8, 20, 8
    else:
        n = struct.unpack(endian + "H", data[off : off + 2])[0]
        ebase, esize, inline = off + 2, 12, 4
    tags = {}
    for i in range(n):
        e = data[ebase + i * esize : ebase + (i + 1) * esize]
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
            raw = data[o : o + total]
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
    tail = ebase + n * esize
    if big:
        (nxt,) = struct.unpack(endian + "Q", data[tail : tail + 8])
    else:
        (nxt,) = struct.unpack(endian + "I", data[tail : tail + 4])
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


def _tiff_header(data: bytes) -> tuple[str, bool, int]:
    """Parse the TIFF/BigTIFF header -> (endian, is_bigtiff, first_ifd_off)."""
    if data[:2] == b"II":
        endian = "<"
    elif data[:2] == b"MM":
        endian = ">"
    else:
        raise ValueError("not a TIFF file")
    (magic,) = struct.unpack(endian + "H", data[2:4])
    if magic == 42:  # classic TIFF
        big = False
        (ifd_off,) = struct.unpack(endian + "I", data[4:8])
    elif magic == 43:  # BigTIFF
        big = True
        osize, zero, ifd_off = struct.unpack(endian + "HHQ", data[4:16])
        if osize != 8 or zero != 0:
            raise ValueError("malformed BigTIFF header")
    else:
        raise ValueError(f"unknown TIFF magic {magic}")
    return endian, big, ifd_off


def _ifd_chain(data: bytes, endian: str, big: bool, first: int) -> list[dict]:
    """All IFDs in file order; [0] is the full-resolution band, the rest
    are overviews/masks (GDAL overview layout: chained reduced-res IFDs)."""
    out = []
    off = first
    seen = set()
    while off and off not in seen:
        seen.add(off)
        t, off = _read_ifd(data, endian, off, big=big)
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


def read_geotiff(
    path: str, overview: int | None = None, band: int = 1
) -> tuple[np.ndarray, GeoTiffMeta]:
    """Read one band of a GeoTIFF into (float64 array with NaN nodata, meta).

    ``band`` is 1-based like GDAL's band index
    (gdal_raster_wrapper.cpp:22-95 wraps one GDALRasterBand). Both
    PlanarConfiguration layouts are handled: 1 (chunky, samples
    interleaved per pixel) and 2 (planar, each band's chunks stored
    separately).

    ``overview=k`` reads the k-th reduced-resolution IFD (0-based, COG-style
    overview chain) instead of the full-resolution band; its grid keeps the
    full-resolution extent at the overview's coarser cell size — matching
    GDAL's overview model (gdal_raster_wrapper.cpp reads whichever band
    object it is handed; overviews are just smaller bands on the same
    extent)."""
    with open(path, "rb") as f:
        data = f.read()
    endian, big, ifd_off = _tiff_header(data)
    chain = _ifd_chain(data, endian, big, ifd_off)
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

    width = t[_TAGS["width"]][0]
    height = t[_TAGS["height"]][0]
    bps = t.get(_TAGS["bits_per_sample"], (8,))[0]
    spp = t.get(_TAGS["samples_per_pixel"], (1,))[0]
    fmt = t.get(_TAGS["sample_format"], (1,))[0]
    comp = t.get(_TAGS["compression"], (1,))[0]
    predictor = t.get(_TAGS["predictor"], (1,))[0]
    planar = t.get(_TAGS["planar_config"], (1,))[0]
    if not 1 <= band <= spp:
        raise ValueError(f"band {band} out of range (file has {spp})")
    dt = _np_dtype(bps, fmt, endian)
    # samples interleaved within each chunk: spp for chunky, 1 for planar
    nsamp = spp if planar == 1 else 1
    jt = t.get(_TAGS["jpeg_tables"], t0.get(_TAGS["jpeg_tables"]))
    jpeg_tables = bytes(jt) if jt is not None else None

    def decode_chunk(raw: bytes, rows: int, cols: int) -> np.ndarray:
        """One decompressed chunk -> (rows, cols, nsamp). Predictor 2
        differencing and TechNote-3 byte planes both operate across the
        full interleaved row (cols*nsamp samples)."""
        if predictor == 3:
            block = _undo_predictor3(raw, rows, cols * nsamp, bps)
            return block.reshape(rows, cols, nsamp)
        block = np.frombuffer(
            raw, dtype=dt, count=rows * cols * nsamp
        ).reshape(rows, cols, nsamp)
        if predictor == 2:
            # per-COMPONENT horizontal differencing (TIFF 6.0 §14): cumsum
            # along the pixel axis with components separated, so axis=1 on
            # the (rows, cols, nsamp) view reconstructs each band
            block = _undo_predictor2(block, dt, bps, endian)
        return block

    arr = np.empty((height, width), dtype=dt.newbyteorder("="))
    if _TAGS["tile_offsets"] in t:
        tw = t[_TAGS["tile_width"]][0]
        tl = t[_TAGS["tile_length"]][0]
        offs = t[_TAGS["tile_offsets"]]
        cnts = t[_TAGS["tile_byte_counts"]]
        tiles_x = (width + tw - 1) // tw
        if planar == 2:  # per-plane chunk groups; keep only this band's
            cpp = len(offs) // spp
            offs = offs[(band - 1) * cpp : band * cpp]
            cnts = cnts[(band - 1) * cpp : band * cpp]
        for k, (o, c) in enumerate(zip(offs, cnts)):
            ty, tx = k // tiles_x, k % tiles_x
            raw = _decompress(data[o : o + c], comp, tw * tl * nsamp * (bps // 8),
                              jpeg_tables=jpeg_tables)
            block = decode_chunk(raw, tl, tw)[:, :, band - 1 if planar == 1 else 0]
            h = min(tl, height - ty * tl)
            w = min(tw, width - tx * tw)
            arr[ty * tl : ty * tl + h, tx * tw : tx * tw + w] = block[:h, :w]
    else:
        rps = t.get(_TAGS["rows_per_strip"], (height,))[0]
        offs = t[_TAGS["strip_offsets"]]
        cnts = t[_TAGS["strip_byte_counts"]]
        if planar == 2:
            cpp = len(offs) // spp
            offs = offs[(band - 1) * cpp : band * cpp]
            cnts = cnts[(band - 1) * cpp : band * cpp]
        row = 0
        for o, c in zip(offs, cnts):
            h = min(rps, height - row)
            raw = _decompress(data[o : o + c], comp, h * width * nsamp * (bps // 8),
                              jpeg_tables=jpeg_tables)
            arr[row : row + h] = decode_chunk(raw, h, width)[
                :, :, band - 1 if planar == 1 else 0
            ]
            row += h

    # georeferencing: raster-space (i, j) tiepoint -> model (x, y). Always
    # taken from the FULL-RESOLUTION IFD (overview IFDs carry no geo tags);
    # an overview keeps the full extent at its own coarser cell size.
    sx, sy = t0[_TAGS["model_pixel_scale"]][:2]
    ti, tj, _tk, tx0, ty0, _tz = t0[_TAGS["model_tiepoint"]][:6]
    xmin = tx0 - ti * sx
    ymax = ty0 + tj * sy
    full_w = t0[_TAGS["width"]][0]
    full_h = t0[_TAGS["height"]][0]
    ext_x, ext_y = full_w * sx, full_h * sy
    grid = Grid(
        xmin, ymax - ext_y, xmin + ext_x, ymax, ext_x / width, ext_y / height
    )

    nodata = None
    nd = t.get(_TAGS["gdal_nodata"], t0.get(_TAGS["gdal_nodata"]))
    if nd is not None:
        try:
            nodata = float(nd.strip())
        except (ValueError, AttributeError):
            nodata = None

    out = arr.astype(np.float64)
    if nodata is not None:
        if np.isnan(nodata):
            pass  # already NaN
        else:
            out[arr == arr.dtype.type(nodata)] = np.nan
    meta = GeoTiffMeta(width, height, np.dtype(dt.base), nodata, grid)
    return out, meta


def geotiff_raster_dataset(path: str, tile: int = 256, band: int = 1):
    """GeoTIFF -> streaming tile Dataset (the engine's native form)."""
    from .raster import raster_from_array

    arr, meta = read_geotiff(path, band=band)
    return raster_from_array(arr, meta.grid, tile=tile)


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
                quality: int) -> bytes:
    """One raw chunky chunk -> abbreviated JPEG stream (Technote 2: the
    shared DQT/DHT ride in the JPEGTables tag)."""
    from ..functions.jpeg import encode_jpeg

    a = np.frombuffer(body, np.uint8, count=rows * cols * nb).reshape(
        rows, cols, nb
    )
    img = a[:, :, 0] if nb == 1 else a
    return encode_jpeg(img, quality=quality, subsampling="4:4:4",
                       include_tables=False)


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
    or 3 samples, 4:4:4, LOSSY at ``jpeg_quality``)."""
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
        if compression == 7:
            ch = lv.shape[0] if tile is None else tile
            cw = lv.shape[1] if tile is None else tile
            comp = [_jpeg_chunk(p, ch, cw, nb, jpeg_quality)
                    for p in raw_chunks]
        else:
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
        extra_items = []  # (tag, typ, cnt, payload bytes)
        if compression == 7:
            from ..functions.jpeg import encode_jpeg_tables

            jt = encode_jpeg_tables(gray=(nb == 1), quality=jpeg_quality)
            extra_items.append((347, 7, len(jt), jt))
            if nb == 3:  # chroma stored 4:4:4 (matches the SOF factors)
                extra_items.append((530, 3, 2, struct.pack("<2H", 1, 1)))
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
