"""GIF87a/89a codec in pure numpy + stdlib.

Written from the public GIF89a specification (CompuServe, 1990; also
W3C-hosted): logical screen descriptor, global/local color tables,
graphic-control extensions (transparency, disposal, delay), interlacing,
and GIF-variant LZW (LSB-first bit packing, variable 3..12-bit codes,
clear/end codes) — distinct from TIFF LZW (MSB-first, early-change),
which lives in sources/geotiff.py.

* ``decode_gif`` — first frame as RGB uint8.
* ``decode_gif_frames`` — all frames composited onto the logical screen
  per the disposal methods (1 keep, 2 restore-background, 3
  restore-previous), honoring per-frame transparency; returns
  (frames, delays_ms). This is what makes the video/animation
  frame-sampling stage (stages/multimodal.py) REAL for animated GIFs.
* ``encode_gif`` — single- or multi-frame writer with a true compressing
  LZW encoder and an adaptive <=256-color palette (exact for inputs with
  <=256 distinct colors; raises otherwise — no dithering by design, so
  round-trips are bit-exact and deterministic).

Reference parity note: the reference's GDAL stack reads GIF via its gif
driver (gdal_raster_wrapper.cpp:22-95 wraps any GDAL-supported band);
here it doubles as a real multimodal web-payload decoder.
"""

from __future__ import annotations

import struct

import numpy as np

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _lzw_decode(mcs: int, data: bytes, npix: int) -> np.ndarray:
    """GIF LZW: LSB-first packed variable-width codes -> index array."""
    clear = 1 << mcs
    end = clear + 1
    out = np.empty(npix, dtype=np.uint8)
    n_out = 0
    # table: list of byte strings; rebuilt on clear
    base = [bytes([i]) for i in range(clear)] + [b"", b""]

    table = list(base)
    width = mcs + 1
    prev: bytes | None = None

    acc = 0
    nbits = 0
    pos = 0
    nd = len(data)
    while True:
        while nbits < width:
            if pos >= nd:
                # missing explicit end code: tolerate (common in the wild)
                return out[:n_out] if n_out < npix else out
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = list(base)
            width = mcs + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("corrupt GIF LZW stream")
        if prev is not None and len(table) == (1 << width) and width < 12:
            width += 1
        k = len(entry)
        if n_out + k > npix:
            k = npix - n_out
        out[n_out:n_out + k] = np.frombuffer(entry[:k], np.uint8)
        n_out += k
        if n_out >= npix:
            return out
        prev = entry
    if n_out < npix:
        raise ValueError("GIF image data truncated")
    return out


def _lzw_encode(mcs: int, indices: np.ndarray) -> bytes:
    """Compressing GIF LZW encoder (dict of tuples -> code)."""
    clear = 1 << mcs
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def put(code: int, width: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    nxt = end + 1
    width = mcs + 1
    put(clear, width)
    w = b""
    for px in indices.tobytes():
        wk = w + bytes([px])
        if wk in table:
            w = wk
            continue
        put(table[w], width)
        table[wk] = nxt
        nxt += 1
        if nxt - 1 == (1 << width) and width < 12:
            width += 1
        if nxt >= 4096:
            put(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            nxt = end + 1
            width = mcs + 1
        w = bytes([px])
    if w:
        put(table[w], width)
    put(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _sub_blocks(data: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate GIF data sub-blocks starting at pos; return (bytes,
    position after the 0x00 terminator)."""
    parts = []
    while True:
        n = data[pos]
        pos += 1
        if n == 0:
            break
        parts.append(data[pos:pos + n])
        pos += n
    return b"".join(parts), pos


def _deinterlace(rows: np.ndarray, h: int) -> np.ndarray:
    order = np.concatenate(
        [np.arange(start, h, step) for start, step in _INTERLACE_PASSES]
    )
    out = np.empty_like(rows)
    out[order] = rows
    return out


def decode_gif_frames(data: bytes) -> tuple[list[np.ndarray], list[int]]:
    """All frames as uint8 (H, W, 3) RGB on the logical screen, plus
    per-frame delays in ms. Disposal methods 1/2/3 and transparency are
    honored; undisposed regions persist (animation compositing model)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF: bad signature")
    W, H, flags, bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(data[pos:pos + 3 * n], np.uint8).reshape(n, 3)
        pos += 3 * n

    canvas = np.zeros((H, W, 3), dtype=np.uint8)
    if gct is not None and bg < len(gct):
        canvas[:, :] = gct[bg]
    bg_rgb = canvas[0, 0].copy() if H and W else np.zeros(3, np.uint8)

    frames: list[np.ndarray] = []
    delays: list[int] = []
    transparent = None
    disposal = 0
    delay_ms = 0
    while pos < len(data):
        b0 = data[pos]
        pos += 1
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # extension
            label = data[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                blk, pos = _sub_blocks(data, pos)
                gflags, delay_cs, tidx = struct.unpack("<BHB", blk[:4])
                disposal = (gflags >> 2) & 7
                transparent = tidx if gflags & 1 else None
                delay_ms = delay_cs * 10
            else:  # application / comment / plain text: skip
                _, pos = _sub_blocks(data, pos)
            continue
        if b0 != 0x2C:
            raise ValueError(f"unknown GIF block 0x{b0:02x}")
        # image descriptor
        left, top, w, h, iflags = struct.unpack("<HHHHB", data[pos:pos + 9])
        pos += 9
        ct = gct
        if iflags & 0x80:
            n = 2 << (iflags & 7)
            ct = np.frombuffer(data[pos:pos + 3 * n], np.uint8).reshape(n, 3)
            pos += 3 * n
        if ct is None:
            raise ValueError("GIF image with no color table")
        mcs = data[pos]
        pos += 1
        lzw, pos = _sub_blocks(data, pos)
        idx = _lzw_decode(mcs, lzw, w * h).reshape(h, w)
        if iflags & 0x40:
            idx = _deinterlace(idx, h)

        prev_region = canvas[top:top + h, left:left + w].copy()
        rgb = ct[np.minimum(idx, len(ct) - 1)]
        region = canvas[top:top + h, left:left + w]
        if transparent is not None:
            mask = idx != transparent
            region[mask] = rgb[mask]
        else:
            region[:, :] = rgb
        frames.append(canvas.copy())
        delays.append(delay_ms)

        if disposal == 2:  # restore background color
            canvas[top:top + h, left:left + w] = bg_rgb
        elif disposal == 3:  # restore previous
            canvas[top:top + h, left:left + w] = prev_region
        transparent = None
        disposal = 0
        delay_ms = 0
    if not frames:
        raise ValueError("GIF has no image data")
    return frames, delays


def decode_gif(data: bytes) -> np.ndarray:
    """First frame -> uint8 (H, W, 3) RGB."""
    return decode_gif_frames(data)[0][0]


def encode_gif(
    frames: np.ndarray | list[np.ndarray],
    delays_ms: list[int] | None = None,
    interlace: bool = False,
) -> bytes:
    """uint8 (h, w, 3) RGB frame(s) -> GIF89a bytes.

    Builds one exact global palette over all frames (<=256 distinct colors
    required — this is a deterministic fixture/round-trip writer, not a
    quantizing photo encoder)."""
    if isinstance(frames, np.ndarray) and frames.ndim == 3:
        frames = [frames]
    frames = [np.asarray(f) for f in frames]
    for f in frames:
        if f.dtype != np.uint8 or f.ndim != 3 or f.shape[2] != 3:
            raise ValueError("encode_gif needs uint8 (h, w, 3) frames")
    h, w = frames[0].shape[:2]
    flat = np.concatenate([f.reshape(-1, 3) for f in frames])
    colors = np.unique(flat, axis=0)
    if len(colors) > 256:
        raise ValueError(
            f"{len(colors)} distinct colors; encode_gif is exact-palette "
            "(<=256) by design"
        )
    # palette size: power of two >= max(2, ncolors)
    size_exp = max(1, int(np.ceil(np.log2(max(2, len(colors))))))
    ncol = 1 << size_exp
    palette = np.zeros((ncol, 3), np.uint8)
    palette[:len(colors)] = colors
    # color -> index via packed-u32 lookup
    packed = (colors[:, 0].astype(np.uint32) << 16) | (
        colors[:, 1].astype(np.uint32) << 8) | colors[:, 2]
    order = np.argsort(packed)

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((size_exp - 1) & 7) << 4
                       | (size_exp - 1), 0, 0)
    out += palette.tobytes()
    if len(frames) > 1:
        # Netscape looping application extension (public de-facto standard)
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    mcs = max(2, size_exp)
    for fi, f in enumerate(frames):
        if f.shape[:2] != (h, w):
            raise ValueError("all frames must share the logical screen size")
        if delays_ms is not None:
            d = delays_ms[fi] if fi < len(delays_ms) else 0
            out += b"\x21\xf9" + bytes([4]) + struct.pack(
                "<BHB", 0, d // 10, 0) + b"\x00"
        fp = (f[:, :, 0].astype(np.uint32) << 16) | (
            f[:, :, 1].astype(np.uint32) << 8) | f[:, :, 2]
        idx = order[np.searchsorted(packed[order], fp.ravel())].astype(
            np.uint8).reshape(h, w)
        iflags = 0x40 if interlace else 0
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, iflags)
        rows = idx
        if interlace:
            sel = np.concatenate(
                [np.arange(s, h, st) for s, st in _INTERLACE_PASSES]
            )
            rows = idx[sel]
        out += bytes([mcs])
        lzw = _lzw_encode(mcs, rows.ravel())
        for i in range(0, len(lzw), 255):
            blk = lzw[i:i + 255]
            out += bytes([len(blk)]) + blk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def count_gif_frames(data: bytes) -> int:
    """Exact frame count by walking the block structure (sub-block lengths
    only — no LZW decode). O(#blocks), used by the header-only probe."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    flags = data[10]
    pos = 13 + (3 * (2 << (flags & 7)) if flags & 0x80 else 0)
    count = 0
    n = len(data)
    while pos < n:
        b = data[pos]
        pos += 1
        if b == 0x3B:
            break
        if b == 0x21:  # extension: label + sub-blocks
            pos += 1
            while pos < n:
                k = data[pos]
                pos += 1 + k
                if k == 0:
                    break
        elif b == 0x2C:  # image descriptor
            iflags = data[pos + 8]
            pos += 9
            if iflags & 0x80:
                pos += 3 * (2 << (iflags & 7))
            pos += 1  # LZW min code size
            while pos < n:
                k = data[pos]
                pos += 1 + k
                if k == 0:
                    break
            count += 1
        else:
            break
    return count
