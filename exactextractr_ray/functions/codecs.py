"""Real media codecs implementable from the standard library alone.

The container has no PIL/ffmpeg, but three common formats need nothing
beyond stdlib zlib/struct/wave + numpy, so the multimodal decode stages
(stages/multimodal.py) are REAL for them and stubbed only for formats that
genuinely require native codecs (video containers; JPEG lives in the
sibling from-spec module functions/jpeg.py):

* PNG  — full critical-chunk decoder: zlib inflate, all five filter types
  (None/Sub/Up/Average/Paeth, PNG spec §9), color types 0 (gray),
  2 (RGB), 3 (palette/PLTE), 4 (gray+alpha), 6 (RGBA), bit depths
  1/2/4/8/16, Adam7 interlacing; plus an encoder (filter 0, 8-bit
  non-interlaced) for round-trip tests and fixture generation.
* BMP  — uncompressed 24-bit BI_RGB (bottom-up and top-down), plus encoder.
* WAV  — PCM16 via the stdlib ``wave`` module, plus encoder.

Everything is public file-format knowledge (PNG: RFC 2083 / W3C spec;
BMP/WAV: Microsoft/IBM public specs). Filters Sub/Up are vectorized (Sub is
a per-byte-lane prefix sum mod 256); Average/Paeth carry a true sequential
dependency on the previous pixel, so those rows fall back to a per-pixel
loop — decode cost is dominated by zlib either way.
"""

from __future__ import annotations

import io
import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"

_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _png_unfilter(raw: np.ndarray, height: int, stride: int,
                  bpp: int) -> np.ndarray:
    """Undo the five PNG row filters at BYTE level (PNG spec §9).
    raw: (height, stride+1) uint8 rows with leading filter byte."""
    ftypes = raw[:, 0]
    lines = raw[:, 1:].astype(np.int64)  # mod-256 arithmetic w/o overflow
    out = np.empty((height, stride), dtype=np.int64)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(height):
        f = int(ftypes[y])
        line = lines[y]
        if f == 0:  # None
            cur = line.copy()
        elif f == 1:  # Sub: per-byte-lane prefix sum mod 256
            pad = (-stride) % bpp
            if pad:
                ext = np.concatenate([line, np.zeros(pad, np.int64)])
                cur = (ext.reshape(-1, bpp).cumsum(axis=0).reshape(-1)
                       % 256)[:stride]
            else:
                cur = line.reshape(-1, bpp).cumsum(axis=0).reshape(stride) % 256
        elif f == 2:  # Up
            cur = (line + prev) % 256
        elif f == 3:  # Average
            cur = np.empty(stride, dtype=np.int64)
            for i in range(stride):
                left = cur[i - bpp] if i >= bpp else 0
                cur[i] = (line[i] + (left + prev[i]) // 2) % 256
        elif f == 4:  # Paeth
            cur = np.empty(stride, dtype=np.int64)
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                if pa_ <= pb and pa_ <= pc:
                    pred = a
                elif pb <= pc:
                    pred = b
                else:
                    pred = c
                cur[i] = (line[i] + pred) % 256
        else:
            raise ValueError(f"PNG filter type {f} invalid")
        out[y] = cur
        prev = cur
    return out.astype(np.uint8)


def _png_samples(bytes2d: np.ndarray, w: int, channels: int,
                 depth: int) -> np.ndarray:
    """Unfiltered row bytes -> (h, w*channels) uint8 samples. Sub-byte
    depths unpack MSB-first; 16-bit keeps the high byte (8-bit output
    contract)."""
    h = bytes2d.shape[0]
    n = w * channels
    if depth == 8:
        return bytes2d[:, :n]
    if depth == 16:
        return bytes2d[:, : 2 * n][:, 0::2]  # big-endian high byte
    # 1/2/4-bit: bit-unpack each row, MSB first
    unpacked = np.unpackbits(bytes2d, axis=1)
    vals = (
        unpacked.reshape(h, -1, depth)
        * (1 << np.arange(depth - 1, -1, -1))[None, None, :]
    ).sum(axis=2)
    return vals[:, :n].astype(np.uint8)


# Adam7 pass grid: (x0, y0, dx, dy) per pass (PNG spec §8.2)
_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> uint8 array (h, w) for grayscale or (h, w, c) otherwise.

    Full critical-chunk coverage: color types 0 (gray), 2 (RGB), 3
    (palette via PLTE), 4 (gray+alpha), 6 (RGBA); bit depths 1/2/4/8/16
    (sub-byte gray scaled to 8-bit, 16-bit reduced to the high byte);
    Adam7 interlacing. Palette images come back as (h, w, 3) RGB (tRNS
    transparency is not composited — media pipelines grayscale anyway).
    """
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    width = height = None
    bit_depth = color_type = interlace = None
    idat: list[bytes] = []
    plte = None
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", chunk)
            )
        elif ctype == b"PLTE":
            plte = np.frombuffer(chunk, np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(chunk)
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("not a PNG: missing IHDR")
    paletted = color_type == 3
    if paletted:
        channels = 1
        if plte is None:
            raise ValueError("palette PNG missing PLTE chunk")
    elif color_type in _PNG_CHANNELS:
        channels = _PNG_CHANNELS[color_type]
    else:
        raise NotImplementedError(f"PNG color type {color_type} unsupported")
    if bit_depth not in (1, 2, 4, 8, 16):
        raise NotImplementedError(f"PNG bit depth {bit_depth} unsupported")
    if interlace not in (0, 1):
        raise NotImplementedError(f"PNG interlace method {interlace}")

    raw = zlib.decompress(b"".join(idat))
    bpp = max(1, channels * bit_depth // 8)

    def decode_pass(buf: memoryview, w: int, h: int):
        """One filtered sub-image -> (samples (h, w*channels), bytes read)."""
        stride = (w * channels * bit_depth + 7) // 8
        need = h * (stride + 1)
        if len(buf) < need:
            raise ValueError("PNG IDAT length mismatch")
        rows = np.frombuffer(buf[:need], dtype=np.uint8).reshape(
            h, stride + 1
        )
        return _png_samples(
            _png_unfilter(rows, h, stride, bpp), w, channels, bit_depth
        ), need

    if interlace == 0:
        samples, used = decode_pass(memoryview(raw), width, height)
    else:
        samples = np.zeros((height, width * channels), dtype=np.uint8)
        buf = memoryview(raw)
        for (x0, y0, dx, dy) in _ADAM7:
            pw = (width - x0 + dx - 1) // dx
            ph = (height - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            sub, used = decode_pass(buf, pw, ph)
            buf = buf[used:]
            sub = sub.reshape(ph, pw, channels)
            view = samples.reshape(height, width, channels)
            view[y0::dy, x0::dx] = sub

    if paletted:
        idx = samples.reshape(height, width)
        return plte[np.minimum(idx, len(plte) - 1)]
    if not paletted and color_type == 0 and bit_depth < 8:
        # scale sub-byte gray to full 8-bit range
        samples = (samples.astype(np.uint16) * 255
                   // ((1 << bit_depth) - 1)).astype(np.uint8)
    img = samples
    if channels == 1:
        return img.reshape(height, width)
    return img.reshape(height, width, channels)


def _png_chunk(ctype: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + ctype
        + payload
        + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray) -> bytes:
    """uint8 (h, w) / (h, w, 2|3|4) -> PNG bytes (filter 0, one IDAT)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        color_type, channels = 0, 1
        h, w = img.shape
    elif img.ndim == 3 and img.shape[2] in (2, 3, 4):
        channels = img.shape[2]
        color_type = {2: 4, 3: 2, 4: 6}[channels]
        h, w = img.shape[:2]
    else:
        raise ValueError(f"unsupported image shape {img.shape}")
    flat = img.reshape(h, w * channels)
    raw = b"".join(b"\x00" + flat[y].tobytes() for y in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


# ---------------- BMP (uncompressed 24-bit) ----------------


def decode_bmp(data: bytes) -> np.ndarray:
    """BMP bytes (BI_RGB 24-bit) -> uint8 (h, w, 3) RGB array."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP: bad signature")
    (off,) = struct.unpack("<I", data[10:14])
    (hdr_size,) = struct.unpack("<I", data[14:18])
    if hdr_size < 40:
        raise NotImplementedError("BMP core header unsupported")
    width, height = struct.unpack("<ii", data[18:26])
    planes, bpp = struct.unpack("<HH", data[26:30])
    (compression,) = struct.unpack("<I", data[30:34])
    if bpp != 24 or compression != 0:
        raise NotImplementedError(f"BMP bpp={bpp} compression={compression}")
    bottom_up = height > 0
    height = abs(height)
    row_bytes = (width * 3 + 3) & ~3  # rows pad to 4 bytes
    px = np.frombuffer(
        data, dtype=np.uint8, count=height * row_bytes, offset=off
    ).reshape(height, row_bytes)[:, : width * 3]
    img = px.reshape(height, width, 3)[:, :, ::-1]  # BGR -> RGB
    if bottom_up:
        img = img[::-1]
    return np.ascontiguousarray(img)


def encode_bmp(img: np.ndarray) -> bytes:
    """uint8 (h, w, 3) RGB -> 24-bit bottom-up BMP bytes."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("encode_bmp needs (h, w, 3)")
    h, w = img.shape[:2]
    row_bytes = (w * 3 + 3) & ~3
    body = np.zeros((h, row_bytes), dtype=np.uint8)
    body[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    pixels = body.tobytes()
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(pixels), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 2835,
                       2835, 0, 0)
    return header + info + pixels


# ---------------- WAV (PCM16) ----------------


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (float32 mono waveform in [-1, 1], sample_rate).
    Multi-channel input is averaged to mono (float32 mean)."""
    import wave

    with wave.open(io.BytesIO(data), "rb") as f:
        if f.getsampwidth() != 2:
            raise NotImplementedError("only PCM16 WAV supported")
        n = f.getnframes()
        ch = f.getnchannels()
        rate = f.getframerate()
        pcm = np.frombuffer(f.readframes(n), dtype="<i2").reshape(-1, ch)
    wav = pcm.astype(np.float32).mean(axis=1) / 32768.0
    return wav, rate


def encode_wav(wav: np.ndarray, sample_rate: int = 16000) -> bytes:
    """float32 mono [-1, 1] -> PCM16 WAV bytes."""
    import wave

    pcm = np.clip(np.asarray(wav, dtype=np.float64) * 32768.0, -32768, 32767)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(pcm.astype("<i2").tobytes())
    return buf.getvalue()


# ---------------- shared helpers ----------------


def to_grayscale(img: np.ndarray) -> np.ndarray:
    """uint8 (h, w[, c]) -> uint8 (h, w) integer luma (ITU-R 601 weights,
    exact integer arithmetic: (299R + 587G + 114B) // 1000)."""
    if img.ndim == 2:
        return img
    c = img.shape[2]
    a = img.astype(np.int64)
    if c == 1:
        return img[:, :, 0]
    if c == 2:  # gray + alpha
        return img[:, :, 0]
    luma = (299 * a[:, :, 0] + 587 * a[:, :, 1] + 114 * a[:, :, 2]) // 1000
    return luma.astype(np.uint8)


def resize_nearest(img: np.ndarray, hw: tuple[int, int]) -> np.ndarray:
    """Deterministic nearest-neighbor resample to (h, w): source index =
    floor((i + 0.5) * src / dst) — pure integer, parallelism-invariant."""
    th, tw = hw
    sh, sw = img.shape[:2]
    yi = ((2 * np.arange(th) + 1) * sh) // (2 * th)
    xi = ((2 * np.arange(tw) + 1) * sw) // (2 * tw)
    return img[yi][:, xi]


def sniff_media(data: bytes) -> str:
    """Magic-byte container sniff for the decode dispatch."""
    if data[:8] == PNG_SIG:
        return "image/png"
    if data[:2] == b"BM":
        return "image/bmp"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "audio/wav"
    if data[:4] == b"FORM" and data[8:12] in (b"AIFF", b"AIFC"):
        return "audio/aiff"
    if data[:4] == b".snd":
        return "audio/basic"  # Sun AU
    if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
        return "video/avi"
    if len(data) >= 12 and data[4:8] == b"ftyp":
        # ISO BMFF (14496-12 §4.3): item-based HEIF stills (AVIF/HEIC)
        # vs track-based MP4/QuickTime/M4A, split by major brand
        brand = data[8:12]
        if brand in (b"avif", b"avis"):
            return "image/avif"
        if brand in (b"heic", b"heix", b"hevc", b"hevx", b"mif1"):
            return "image/heic"
        return "video/mp4"
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        # lossless (VP8L) decodes via functions/webp.py; lossy (VP8)
        # needs the boolean arithmetic coder and stays unsupported
        return "image/webp"
    if data[:4] == b"\x1a\x45\xdf\xa3":
        # EBML magic: Matroska or its WebM profile (functions/webm.py)
        return "video/webm"
    if data[:4] == b"OggS":
        return "audio/ogg"
    if data[:4] == b"fLaC":
        return "audio/flac"
    if data[:3] == b"ID3" or (
        len(data) >= 4 and data[0] == 0xFF and (data[1] & 0xE0) == 0xE0
        and (data[1] >> 1) & 3 != 0 and (data[2] >> 4) not in (0, 15)
    ):
        # ID3v2 tag or a valid MPEG audio frame sync (functions/audiometa)
        return "audio/mpeg"
    if data[:5] == b"%PDF-":
        return "application/pdf"
    if data[:3] == b"\xff\xd8\xff":
        return "image/jpeg"
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return "image/gif"
    if data[:1] == b"P" and data[1:2] in b"123456" and data[2:3].isspace():
        return "image/pnm"
    if (
        len(data) >= 6
        and data[:2] == b"\x00\x00"
        and data[2:4] in (b"\x01\x00", b"\x02\x00")
        and 0 < int.from_bytes(data[4:6], "little") <= 64
    ):
        return "image/ico"
    return "application/octet-stream"


def decode_ico(data: bytes, index: int | None = None) -> np.ndarray:
    """Windows ICO/CUR favicon -> uint8 (h, w, 4) RGBA.

    Entries may embed PNG (modern favicons; dispatched to decode_png) or a
    DIB: BITMAPINFOHEADER with doubled height (XOR pixel block + 1-bit AND
    transparency mask, bottom-up, 4-byte row alignment), 32/24-bpp direct
    or 1/4/8-bpp BGRA-paletted. ``index=None`` picks the largest entry —
    the web-pipeline default for multi-size favicons."""
    if data[:8] == PNG_SIG:
        # wild-web favicon.ico files are frequently raw PNGs — accept them
        img = decode_png(data)
        if img.ndim == 2:
            img = np.stack([img] * 3, axis=-1)
        if img.shape[2] == 3:
            img = np.dstack([img, np.full(img.shape[:2], 255, np.uint8)])
        return img
    if len(data) < 6:
        raise ValueError("not an ICO: truncated header")
    res, typ, cnt = struct.unpack("<HHH", data[:6])
    if res != 0 or typ not in (1, 2) or cnt == 0:
        raise ValueError("not an ICO: bad ICONDIR")
    entries = []
    for i in range(cnt):
        e = data[6 + 16 * i : 6 + 16 * (i + 1)]
        if len(e) < 16:
            raise ValueError("ICO directory truncated")
        w, h, _nc, _r, _planes, bpp, size, off = struct.unpack("<BBBBHHII", e)
        entries.append((w or 256, h or 256, bpp, size, off))
    if index is None:
        index = max(range(cnt), key=lambda i: entries[i][0] * entries[i][1])
    w, h, bpp, size, off = entries[index]
    body = data[off : off + size]
    if body[:8] == PNG_SIG:
        img = decode_png(body)
        if img.ndim == 2:
            img = np.stack([img] * 3, axis=-1)
        if img.shape[2] == 3:
            img = np.dstack([img, np.full(img.shape[:2], 255, np.uint8)])
        return img
    (bisize,) = struct.unpack("<I", body[:4])
    if bisize != 40:
        raise NotImplementedError(f"ICO DIB header size {bisize}")
    _, bw, bh2, _pl, bpp, comp = struct.unpack("<IiiHHI", body[:20])
    if comp != 0:
        raise NotImplementedError(f"ICO DIB compression {comp}")
    bh = bh2 // 2 if bh2 == 2 * h else bh2  # AND mask may be omitted
    pos = 40
    palette = None
    if bpp <= 8:
        ncol = struct.unpack("<I", body[32:36])[0] or (1 << bpp)
        palette = np.frombuffer(
            body[pos : pos + 4 * ncol], np.uint8
        ).reshape(ncol, 4)[:, [2, 1, 0]]  # BGRA -> RGB
        pos += 4 * ncol
    xor_stride = (bw * bpp + 31) // 32 * 4
    xor = np.frombuffer(
        body[pos : pos + xor_stride * bh], np.uint8
    ).reshape(bh, xor_stride)
    pos += xor_stride * bh
    if bpp == 32:
        px = xor[:, : 4 * bw].reshape(bh, bw, 4)[:, :, [2, 1, 0, 3]]
        rgba = px.copy()
    elif bpp == 24:
        rgb = xor[:, : 3 * bw].reshape(bh, bw, 3)[:, :, [2, 1, 0]]
        rgba = np.dstack([rgb, np.full((bh, bw), 255, np.uint8)])
    elif bpp in (1, 4, 8):
        if bpp == 8:
            idx = xor[:, :bw]
        else:
            bits = np.unpackbits(xor, axis=1)
            per = bits.reshape(bh, -1, bpp)
            idx = (
                per * (1 << np.arange(bpp - 1, -1, -1))[None, None, :]
            ).sum(axis=2)[:, :bw].astype(np.uint8)
        rgb = palette[np.minimum(idx, len(palette) - 1)]
        rgba = np.dstack([rgb, np.full((bh, bw), 255, np.uint8)])
    else:
        raise NotImplementedError(f"ICO bpp {bpp}")
    # AND transparency mask (1-bit, same bottom-up order), if present.
    # Old-style 32-bpp icons store an all-zero alpha channel and rely on
    # the mask — detect and fall back (the standard reader heuristic).
    and_stride = (bw + 31) // 32 * 4
    if (bpp != 32 or rgba[:, :, 3].max() == 0) and \
            len(body) >= pos + and_stride * bh:
        mask = np.unpackbits(
            np.frombuffer(
                body[pos : pos + and_stride * bh], np.uint8
            ).reshape(bh, and_stride),
            axis=1,
        )[:, :bw]
        # both cases reaching here have no alpha information in the pixel
        # block (palette/24-bpp, or 32-bpp with a dead alpha channel)
        rgba[:, :, 3] = np.where(mask == 1, 0, 255)
    return rgba[::-1]  # bottom-up -> top-down


def decode_pnm(data: bytes) -> np.ndarray:
    """Netpbm PBM/PGM/PPM (P1-P6) -> uint8 (h, w) or (h, w, 3).

    Public netpbm formats: ASCII (P1/P2/P3) and binary (P4/P5/P6), '#'
    comments, 16-bit maxval reduced to the high byte (8-bit contract),
    PBM 1=black convention mapped to 0/255 gray."""
    if data[:1] != b"P" or data[1:2] not in b"123456":
        raise ValueError("not a PNM: bad magic")
    kind = int(data[1:2])
    # header tokenizer: whitespace-separated ints, '#' to EOL is comment
    pos = 2
    tokens = []
    need = 2 if kind in (1, 4) else 3  # PBM has no maxval
    while len(tokens) < need:
        c = data[pos:pos + 1]
        if not c:
            raise ValueError("PNM header truncated")
        if c == b"#":
            nl = data.find(b"\n", pos)
            pos = (nl if nl >= 0 else len(data)) + 1
        elif c.isspace():
            pos += 1
        else:
            j = pos
            while j < len(data) and not data[j:j + 1].isspace():
                j += 1
            tokens.append(int(data[pos:j]))
            pos = j
    w, h = tokens[0], tokens[1]
    maxval = 1 if kind in (1, 4) else tokens[2]
    if kind <= 3:  # ASCII
        vals = np.array(data[pos:].split(), dtype=np.int64)
    else:
        pos += 1  # single whitespace byte after the header
        if kind == 4:  # packed bits, rows byte-aligned
            stride = (w + 7) // 8
            bits = np.unpackbits(
                np.frombuffer(data, np.uint8, count=stride * h, offset=pos)
                .reshape(h, stride),
                axis=1,
            )[:, :w]
            return ((1 - bits) * 255).astype(np.uint8)  # 1 = black
        n = w * h * (3 if kind == 6 else 1)
        if maxval > 255:
            vals = np.frombuffer(data, ">u2", count=n, offset=pos).astype(
                np.int64
            )
        else:
            vals = np.frombuffer(data, np.uint8, count=n, offset=pos).astype(
                np.int64
            )
    if kind == 1:
        return ((1 - vals.reshape(h, w)) * 255).astype(np.uint8)
    if maxval > 255:
        vals = vals >> 8
    elif maxval != 255:
        vals = vals * 255 // maxval
    if kind in (3, 6):
        return vals.reshape(h, w, 3).astype(np.uint8)
    return vals.reshape(h, w).astype(np.uint8)


def encode_pnm(img: np.ndarray, ascii_: bool = False) -> bytes:
    """uint8 (h, w) gray -> PGM, (h, w, 3) -> PPM (binary by default)."""
    img = np.asarray(img)
    if img.dtype != np.uint8:
        raise ValueError("encode_pnm needs uint8")
    color = img.ndim == 3
    h, w = img.shape[:2]
    if ascii_:
        magic = b"P3" if color else b"P2"
        body = b"\n".join(
            b" ".join(str(v).encode() for v in row)
            for row in img.reshape(h, -1)
        )
        return magic + f"\n{w} {h}\n255\n".encode() + body + b"\n"
    magic = b"P6" if color else b"P5"
    return magic + f"\n{w} {h}\n255\n".encode() + img.tobytes()


def probe_media(data: bytes) -> dict:
    """Header-only media probe: {"kind", "width", "height", "frames",
    "sample_rate"} without decoding payloads — the cheap pre-filter a
    corpus pipeline runs before spending decode cost (drop tracking
    pixels, giant images, zero-length audio). Fields that don't apply
    are 0. Unknown containers come back kind="application/octet-stream".

    Costs one pass over the HEADER bytes only (PNG IHDR, JPEG SOF scan,
    GIF logical screen, BMP/ICO/AVI/WAV/AIFF/AU headers, PNM tokens)."""
    kind = sniff_media(data)
    w = h = frames = rate = 0
    try:
        if kind == "image/png":
            w, h = struct.unpack(">II", data[16:24])
        elif kind == "image/jpeg":
            pos = 2
            n = len(data)
            while pos + 4 <= n:
                if data[pos] != 0xFF:
                    break
                marker = data[pos + 1]
                if marker == 0xFF:
                    pos += 1
                    continue
                if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                    pos += 2
                    continue
                if marker in (0xDA, 0xD9):
                    break
                (seglen,) = struct.unpack(">H", data[pos + 2:pos + 4])
                if marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                              0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                    h, w = struct.unpack(">HH", data[pos + 5:pos + 9])
                    break
                pos += 2 + seglen
        elif kind == "image/gif":
            from .gif import count_gif_frames

            w, h = struct.unpack("<HH", data[6:10])
            frames = count_gif_frames(data)
        elif kind == "image/bmp":
            w, h = struct.unpack("<ii", data[18:26])
            h = abs(h)
        elif kind == "image/ico":
            cnt = struct.unpack("<H", data[4:6])[0]
            best = 0
            for i in range(cnt):
                e = data[6 + 16 * i: 6 + 16 * (i + 1)]
                ew, eh = (e[0] or 256), (e[1] or 256)
                if ew * eh > best:
                    best, w, h = ew * eh, ew, eh
        elif kind == "image/pnm":
            toks = []
            pos = 2
            while len(toks) < 2 and pos < min(len(data), 256):
                c = data[pos:pos + 1]
                if c == b"#":
                    pos = data.find(b"\n", pos) + 1 or len(data)
                elif c.isspace():
                    pos += 1
                else:
                    j = pos
                    while j < len(data) and not data[j:j + 1].isspace():
                        j += 1
                    toks.append(int(data[pos:j]))
                    pos = j
            if len(toks) == 2:
                w, h = toks
        elif kind == "image/webp":
            from .webp import webp_info

            info = webp_info(data)
            w, h = info["width"], info["height"]
        elif kind == "application/pdf":
            # page count via the reconstruction scan; "frames" = pages
            from .pdf import PdfFile

            frames = len(PdfFile(data).pages())
        elif kind == "video/avi":
            from .avi import parse_avi

            info = parse_avi(data)
            w, h = info["width"], info["height"]
            frames = len(info["frames"])
            rate = int(info["fps"])
        elif kind in ("video/mp4", "image/avif", "image/heic"):
            from .mp4 import parse_mp4

            info = parse_mp4(data)
            w, h = info["width"], info["height"]
            frames = info["n_frames"]
            rate = info["audio_rate"] or int(info["fps"])
        elif kind == "video/webm":
            from .webm import parse_webm

            info = parse_webm(data)
            w, h = info["width"], info["height"]
            frames = info["n_frames"]
            rate = int(info["audio_rate"] or info["fps"])
        elif kind == "audio/mpeg":
            from .audiometa import parse_mp3

            info = parse_mp3(data)
            rate = info["sample_rate"]
            frames = info["n_frames"]
        elif kind == "audio/ogg":
            from .audiometa import parse_ogg

            info = parse_ogg(data)
            rate = info["sample_rate"]
            frames = info["n_packets"]
            w, h = info["width"], info["height"]
        elif kind == "audio/flac":
            from .flac import flac_info

            info = flac_info(data)
            rate = info["sample_rate"]
            frames = info["total_samples"]
        elif kind == "audio/wav":
            import io as _io
            import wave as _wave

            with _wave.open(_io.BytesIO(data), "rb") as f:
                rate = f.getframerate()
                frames = f.getnframes()
        elif kind == "audio/aiff":
            idx = data.find(b"COMM")
            if idx >= 0:
                from .audio import _float80

                _ch, frames, _bits = struct.unpack(
                    ">hIh", data[idx + 8:idx + 16]
                )
                rate = int(round(_float80(data[idx + 16:idx + 26])))
        elif kind == "audio/basic":
            off, size, enc, rate, ch = struct.unpack(">5I", data[4:24])
            per = {1: 1, 2: 1, 3: 2, 4: 3, 5: 4, 27: 1}.get(enc, 1)
            nbytes = size if size != 0xFFFFFFFF else len(data) - off
            frames = nbytes // per // max(ch, 1)
    except (struct.error, ValueError, IndexError, NotImplementedError):
        # probe never raises: fragmented MP4 etc. come back with zeros
        pass
    return {"kind": kind, "width": int(w), "height": int(h),
            "frames": int(frames), "sample_rate": int(rate)}
