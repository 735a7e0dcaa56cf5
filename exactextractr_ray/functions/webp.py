"""WebP codec — lossless VP8L from the public bitstream specification.

Decode is REAL and complete for the lossless format: simple and
code-length-coded canonical prefix codes, color cache, meta prefix
groups (entropy image), LZ77 backward references with the 120-entry
distance neighbor map, and all four transforms (predictor, cross-color,
subtract-green, color-indexing including sub-byte index bundling).
Containers: bare ``VP8L`` files, ``VP8X`` extended layout, and ``ALPH``
alpha-plane chunks (raw and VP8L-compressed, all four alpha filters) —
so the alpha plane of real-web lossy files decodes through the same
lossless entropy layer.  Lossy ``VP8 `` payload decode requires the
boolean arithmetic coder and stays an explicit NotImplementedError.

Encode (`encode_webp_lossless`) is the fixture/round-trip writer:
canonical-Huffman or balanced complete codes, optional subtract-green /
uniform cross-color / uniform predictor / palette (with bundling)
transforms, optional distance-1 and previous-row LZ77 runs and a color
cache — every decoder code path has an encoder that exercises it, so
round-trip tests prove the inverses exactly.

Reference parity: the reference reads WebP rasters through GDAL when it
is built with libwebp (src/exactextract/src/gdal_raster_wrapper.cpp:22-95
treats any GDAL-readable band uniformly); this module is the from-spec
pure numpy/stdlib equivalent for the lossless format.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "decode_webp",
    "decode_webp_alpha",
    "encode_webp_lossless",
    "webp_info",
]

# Code-length-code symbol transmission order (spec §"Prefix code groups";
# note 16 comes after 5 — validated against libwebp-produced streams).
_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

# Distance neighbor map (spec §"Decoding of distances"): LZ77 distance
# codes 1..120 address nearby pixels as (dx, dy) offsets; plain distances
# are coded as value+120.  (dx, dy) -> distance = dy * xsize + dx.
_DIST_MAP = (
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
)
assert len(_DIST_MAP) == 120 and len(set(_DIST_MAP)) == 120

_HASH_MUL = 0x1E35A7BD  # color-cache hash multiplier (spec §"Color cache")


def _div_up(a: int, b: int) -> int:
    return -(-a // b)


# ---------------------------------------------------------------------------
# bit I/O — VP8L reads bits LSB-first within each byte
# ---------------------------------------------------------------------------


class _BitReader:
    __slots__ = ("data", "pos", "val", "bits", "end")

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos
        self.val = 0
        self.bits = 0
        self.end = len(data)

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        while self.bits < n:
            if self.pos < self.end:
                self.val |= self.data[self.pos] << self.bits
                self.pos += 1
            elif self.pos < self.end + 4:
                self.pos += 1  # tolerate a few zero-padded bits at EOS
            else:
                raise ValueError("VP8L: truncated bitstream")
            self.bits += 8
        r = self.val & ((1 << n) - 1)
        self.val >>= n
        self.bits -= n
        return r


class _BitWriter:
    __slots__ = ("out", "val", "bits")

    def __init__(self):
        self.out = bytearray()
        self.val = 0
        self.bits = 0

    def write(self, v: int, n: int) -> None:
        self.val |= (v & ((1 << n) - 1)) << self.bits
        self.bits += n
        while self.bits >= 8:
            self.out.append(self.val & 0xFF)
            self.val >>= 8
            self.bits -= 8

    def finish(self) -> bytes:
        if self.bits:
            self.out.append(self.val & 0xFF)
            self.val = 0
            self.bits = 0
        return bytes(self.out)


# ---------------------------------------------------------------------------
# canonical prefix codes (RFC 1951 assignment; code bits appear in the
# stream MSB-of-code first, so the LUT is indexed by bit-reversed codes)
# ---------------------------------------------------------------------------


def _rev_bits(v: int, n: int) -> int:
    r = 0
    for _ in range(n):
        r = (r << 1) | (v & 1)
        v >>= 1
    return r


def _build_decoder(lengths):
    """lengths[sym] -> decoder. Returns ('deg', sym) for 0-bit degenerate
    single-symbol codes, else (sym_lut, len_lut, max_len) peek tables."""
    lengths = np.asarray(lengths, np.int32)
    used = np.nonzero(lengths)[0]
    if len(used) == 0:
        raise ValueError("VP8L: empty prefix code")
    if len(used) == 1:
        return ("deg", int(used[0]))
    max_len = int(lengths[used].max())
    if max_len > 15:
        raise ValueError("VP8L: code length > 15")
    bl_count = np.bincount(lengths[used], minlength=max_len + 1)
    code = 0
    next_code = [0] * (max_len + 1)
    for ln in range(1, max_len + 1):
        code = (code + int(bl_count[ln - 1])) << 1
        next_code[ln] = code
    if next_code[max_len] + int(bl_count[max_len]) != (1 << max_len):
        raise ValueError("VP8L: incomplete prefix code")
    size = 1 << max_len
    sym_lut = np.zeros(size, np.int32)
    len_lut = np.zeros(size, np.int32)
    for s in used:
        ln = int(lengths[s])
        c = next_code[ln]
        next_code[ln] += 1
        rev = _rev_bits(c, ln)
        idx = np.arange(rev, size, 1 << ln)
        sym_lut[idx] = s
        len_lut[idx] = ln
    return (sym_lut, len_lut, max_len)


def _decode_sym(br: _BitReader, dec) -> int:
    if isinstance(dec[0], str):  # ("deg", sym): 0-bit single-symbol code
        return dec[1]
    sym_lut, len_lut, ml = dec
    while br.bits < ml:
        if br.pos < br.end:
            br.val |= br.data[br.pos] << br.bits
            br.pos += 1
        elif br.pos < br.end + 4:
            br.pos += 1
        else:
            raise ValueError("VP8L: truncated bitstream")
        br.bits += 8
    v = br.val & ((1 << ml) - 1)
    ln = int(len_lut[v])
    if ln == 0:
        raise ValueError("VP8L: invalid prefix code word")
    br.val >>= ln
    br.bits -= ln
    return int(sym_lut[v])


def _read_code_lengths(br: _BitReader, alphabet: int):
    """Normal (code-length-coded) prefix code per spec §"Normal code
    length code": 19-symbol CL code, symbols 16/17/18 are repeats."""
    num_cl = 4 + br.read(4)
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[_CL_ORDER[i]] = br.read(3)
    cl_dec = _build_decoder(cl_lengths)
    lengths = [0] * alphabet
    if br.read(1):  # explicit max_symbol
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet
    sym = 0
    prev = 8
    while sym < alphabet:
        if max_symbol == 0:
            break
        max_symbol -= 1
        cl = _decode_sym(br, cl_dec)
        if cl < 16:
            lengths[sym] = cl
            sym += 1
            if cl != 0:
                prev = cl
        else:
            if cl == 16:
                repeat, val = 3 + br.read(2), prev
            elif cl == 17:
                repeat, val = 3 + br.read(3), 0
            else:
                repeat, val = 11 + br.read(7), 0
            if sym + repeat > alphabet:
                raise ValueError("VP8L: code length repeat overflow")
            if val:
                for k in range(repeat):
                    lengths[sym + k] = val
            sym += repeat
    return lengths


def _read_prefix_code(br: _BitReader, alphabet: int):
    if br.read(1):  # simple code: 1 or 2 symbols listed explicitly
        num_symbols = br.read(1) + 1
        s0 = br.read(8) if br.read(1) else br.read(1)
        if num_symbols == 1:
            return ("deg", s0)
        s1 = br.read(8)
        # canonical over listing order: first symbol gets code 0
        return (np.array([s0, s1], np.int32), np.array([1, 1], np.int32), 1)
    return _build_decoder(_read_code_lengths(br, alphabet))


def _lz77_value(sym: int, br: _BitReader) -> int:
    """LZ77 length/distance prefix coding (spec §"LZ77 backward ref")."""
    if sym < 4:
        return sym + 1
    extra = (sym - 2) >> 1
    offset = (2 + (sym & 1)) << extra
    return offset + br.read(extra) + 1


def _lz77_sym(value: int):
    """Inverse of _lz77_value: value -> (sym, extra_bits, extra_count)."""
    x = value - 1
    if x < 4:
        return x, 0, 0
    n = x.bit_length() - 1
    half = (x >> (n - 1)) & 1
    sym = 2 * n + half
    return sym, x & ((1 << (n - 1)) - 1), n - 1


# ---------------------------------------------------------------------------
# image stream decode
# ---------------------------------------------------------------------------


def _decode_image_stream(br: _BitReader, w: int, h: int, level0: bool):
    """Decode one spatially-coded image. Returns (argb_1d uint32 array,
    transforms list, final_packed_width). Transforms only at level 0."""
    transforms = []
    seen = set()
    full_w = w
    if level0:
        while br.read(1):
            t = br.read(2)
            if t in seen:
                raise ValueError("VP8L: duplicate transform")
            seen.add(t)
            if t in (0, 1):  # predictor / cross-color: block sub-image
                size_bits = br.read(3) + 2
                bw = _div_up(w, 1 << size_bits)
                bh = _div_up(h, 1 << size_bits)
                sub, _, _ = _decode_image_stream(br, bw, bh, False)
                transforms.append((t, size_bits, sub, bw))
            elif t == 2:  # subtract green
                transforms.append((2,))
            else:  # color indexing (palette)
                n_colors = br.read(8) + 1
                deltas, _, _ = _decode_image_stream(br, n_colors, 1, False)
                # palette entries are component-wise cumulative sums
                b = (np.cumsum(deltas & 0xFF) & 0xFF).astype(np.uint32)
                g = (np.cumsum((deltas >> 8) & 0xFF) & 0xFF).astype(np.uint32)
                r = (np.cumsum((deltas >> 16) & 0xFF) & 0xFF).astype(np.uint32)
                a = (np.cumsum(deltas >> 24) & 0xFF).astype(np.uint32)
                palette = (a << 24) | (r << 16) | (g << 8) | b
                if n_colors <= 2:
                    xbits = 3
                elif n_colors <= 4:
                    xbits = 2
                elif n_colors <= 16:
                    xbits = 1
                else:
                    xbits = 0
                transforms.append((3, n_colors, palette, xbits, w))
                w = _div_up(w, 1 << xbits)  # subsequent syntax uses packed w

    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("VP8L: bad color cache size")
    cache_size = (1 << cache_bits) if cache_bits else 0

    meta = None
    meta_bits = 0
    mw = 0
    num_groups = 1
    if level0 and br.read(1):
        meta_bits = br.read(3) + 2
        mw = _div_up(w, 1 << meta_bits)
        mh = _div_up(h, 1 << meta_bits)
        ent, _, _ = _decode_image_stream(br, mw, mh, False)
        meta = ((ent >> 8) & 0xFFFF).astype(np.int64)  # (red<<8)|green
        num_groups = int(meta.max()) + 1

    groups = []
    green_alpha = 256 + 24 + cache_size
    for _ in range(num_groups):
        groups.append(
            (
                _read_prefix_code(br, green_alpha),
                _read_prefix_code(br, 256),
                _read_prefix_code(br, 256),
                _read_prefix_code(br, 256),
                _read_prefix_code(br, 40),
            )
        )

    n = w * h
    out = np.zeros(n, np.uint32)
    cache = [0] * cache_size if cache_size else None
    shift = 32 - cache_bits if cache_bits else 0
    g_green, g_red, g_blue, g_alpha, g_dist = groups[0]
    pos = 0
    x = 0
    y = 0
    while pos < n:
        if meta is not None:
            gi = int(meta[(y >> meta_bits) * mw + (x >> meta_bits)])
            g_green, g_red, g_blue, g_alpha, g_dist = groups[gi]
        s = _decode_sym(br, g_green)
        if s < 256:
            r = _decode_sym(br, g_red)
            b = _decode_sym(br, g_blue)
            a = _decode_sym(br, g_alpha)
            px = (a << 24) | (r << 16) | (s << 8) | b
            out[pos] = px
            if cache is not None:
                cache[(_HASH_MUL * px & 0xFFFFFFFF) >> shift] = px
            pos += 1
            x += 1
            if x == w:
                x = 0
                y += 1
        elif s < 280:
            length = _lz77_value(s - 256, br)
            dcode = _lz77_value(_decode_sym(br, g_dist), br)
            if dcode > 120:
                dist = dcode - 120
            else:
                dx, dy = _DIST_MAP[dcode - 1]
                dist = dy * w + dx
                if dist < 1:
                    dist = 1
            if dist > pos or pos + length > n:
                raise ValueError("VP8L: backward reference out of range")
            if cache is None:
                if dist >= length:
                    out[pos : pos + length] = out[pos - dist : pos - dist + length]
                    pos += length
                else:
                    for _ in range(length):
                        out[pos] = out[pos - dist]
                        pos += 1
            else:
                for _ in range(length):
                    px = int(out[pos - dist])
                    out[pos] = px
                    cache[(_HASH_MUL * px & 0xFFFFFFFF) >> shift] = px
                    pos += 1
            x = pos % w
            y = pos // w
        else:
            if cache is None:
                raise ValueError("VP8L: cache symbol without color cache")
            px = cache[s - 280]
            out[pos] = px
            pos += 1
            x += 1
            if x == w:
                x = 0
                y += 1
    return out, transforms, w


# ---------------------------------------------------------------------------
# inverse transforms
# ---------------------------------------------------------------------------


def _avg2(a: int, b: int) -> int:
    # per-channel floor average via SWAR (no channel crosses: carry masked)
    return (a & b) + (((a ^ b) & 0xFEFEFEFE) >> 1)


def _chan(p: int):
    return (p >> 24) & 0xFF, (p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF


def _clamp_add_sub_full(l: int, t: int, tl: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        v = ((l >> sh) & 0xFF) + ((t >> sh) & 0xFF) - ((tl >> sh) & 0xFF)
        out |= (0 if v < 0 else 255 if v > 255 else v) << sh
    return out


def _clamp_add_sub_half(ave: int, tl: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        a = (ave >> sh) & 0xFF
        c = (tl >> sh) & 0xFF
        d = a - c
        v = a + (d // 2 if d >= 0 else -((-d) // 2))  # C99 truncating /2
        out |= (0 if v < 0 else 255 if v > 255 else v) << sh
    return out


def _select(l: int, t: int, tl: int) -> int:
    la, lr, lg, lb = _chan(l)
    ta, tr, tg, tb = _chan(t)
    ca, cr, cg, cb = _chan(tl)
    pa = la + ta - ca
    pr = lr + tr - cr
    pg = lg + tg - cg
    pb = lb + tb - cb
    p_l = abs(pa - la) + abs(pr - lr) + abs(pg - lg) + abs(pb - lb)
    p_t = abs(pa - ta) + abs(pr - tr) + abs(pg - tg) + abs(pb - tb)
    return l if p_l < p_t else t


def _add_px(a: int, b: int) -> int:
    # per-channel modular addition
    out = 0
    for sh in (24, 16, 8, 0):
        out |= ((((a >> sh) & 0xFF) + ((b >> sh) & 0xFF)) & 0xFF) << sh
    return out


def _predict(mode: int, out, i: int, w: int) -> int:
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return int(out[i - 1])
    if mode == 2:
        return int(out[i - w])
    if mode == 3:
        return int(out[i - w + 1])
    if mode == 4:
        return int(out[i - w - 1])
    l = int(out[i - 1])
    t = int(out[i - w])
    if mode == 5:
        return _avg2(_avg2(l, int(out[i - w + 1])), t)
    if mode == 6:
        return _avg2(l, int(out[i - w - 1]))
    if mode == 7:
        return _avg2(l, t)
    if mode == 8:
        return _avg2(int(out[i - w - 1]), t)
    if mode == 9:
        return _avg2(t, int(out[i - w + 1]))
    if mode == 10:
        return _avg2(_avg2(l, int(out[i - w - 1])), _avg2(t, int(out[i - w + 1])))
    if mode == 11:
        return _select(l, t, int(out[i - w - 1]))
    if mode == 12:
        return _clamp_add_sub_full(l, t, int(out[i - w - 1]))
    if mode == 13:
        return _clamp_add_sub_half(_avg2(l, t), int(out[i - w - 1]))
    raise ValueError(f"VP8L: predictor mode {mode}")


def _inv_predictor(out, w: int, h: int, size_bits: int, modes, bw: int):
    i = 0
    for y in range(h):
        by = (y >> size_bits) * bw
        for x in range(w):
            if y == 0:
                mode = 1 if x else -1
            elif x == 0:
                mode = 2
            else:
                mode = (int(modes[by + (x >> size_bits)]) >> 8) & 0xFF
            pred = 0xFF000000 if mode == -1 else _predict(mode, out, i, w)
            out[i] = _add_px(int(out[i]), pred)
            i += 1


def _ct_delta(t: int, c: int) -> int:
    # (int8(t) * int8(c)) >> 5 on sign-extended values
    if t >= 128:
        t -= 256
    if c >= 128:
        c -= 256
    return (t * c) >> 5


def _inv_color_transform(out, w: int, h: int, size_bits: int, ctes, bw: int):
    i = 0
    for y in range(h):
        by = (y >> size_bits) * bw
        for x in range(w):
            cte = int(ctes[by + (x >> size_bits)])
            g2r = cte & 0xFF  # blue channel holds green_to_red
            g2b = (cte >> 8) & 0xFF  # green channel holds green_to_blue
            r2b = (cte >> 16) & 0xFF  # red channel holds red_to_blue
            px = int(out[i])
            g = (px >> 8) & 0xFF
            r = ((px >> 16) & 0xFF) + _ct_delta(g2r, g)
            r &= 0xFF
            b = (px & 0xFF) + _ct_delta(g2b, g) + _ct_delta(r2b, r)
            b &= 0xFF
            out[i] = (px & 0xFF00FF00) | (r << 16) | b
            i += 1


def _inv_subtract_green(out):
    g = (out >> 8) & 0xFF
    r = ((out >> 16) & 0xFF) + g
    b = (out & 0xFF) + g
    out[:] = (out & 0xFF00FF00) | ((r & 0xFF) << 16) | (b & 0xFF)


def _inv_palette(out, packed_w: int, h: int, full_w: int, n_colors: int,
                 palette, xbits: int):
    idx = ((out.reshape(h, packed_w) >> 8) & 0xFF).astype(np.int64)
    if xbits:
        per = 1 << xbits
        depth = 8 >> xbits
        sub = (np.arange(full_w) & (per - 1)) * depth
        idx = (idx[:, np.arange(full_w) >> xbits] >> sub[None, :]) & (
            (1 << depth) - 1
        )
    else:
        idx = idx[:, :full_w]
    lut = np.zeros(256, np.uint32)
    lut[:n_colors] = palette[:n_colors]  # out-of-range index -> 0x00000000
    return lut[idx].reshape(-1)


def _apply_inverse_transforms(argb, transforms, packed_w: int, h: int):
    w = packed_w
    for t in reversed(transforms):
        if t[0] == 3:
            _, n_colors, palette, xbits, full_w = t
            argb = _inv_palette(argb, w, h, full_w, n_colors, palette, xbits)
            w = full_w
        elif t[0] == 2:
            _inv_subtract_green(argb)
        elif t[0] == 0:
            _inv_predictor(argb, w, h, t[1], t[2], t[3])
        else:
            _inv_color_transform(argb, w, h, t[1], t[2], t[3])
    return argb, w


def _decode_vp8l_payload(data: bytes, *, header: bool = True,
                         alpha_w: int = 0, alpha_h: int = 0):
    """Decode a VP8L payload to an (h, w) uint32 ARGB array. With
    header=False (ALPH chunks) the dimensions come from the container."""
    br = _BitReader(data)
    if header:
        if br.read(8) != 0x2F:
            raise ValueError("VP8L: bad signature byte")
        w = br.read(14) + 1
        h = br.read(14) + 1
        br.read(1)  # alpha-is-used hint
        if br.read(3) != 0:
            raise ValueError("VP8L: unsupported version")
    else:
        w, h = alpha_w, alpha_h
    argb, transforms, packed_w = _decode_image_stream(br, w, h, True)
    argb, w2 = _apply_inverse_transforms(argb, transforms, packed_w, h)
    if w2 != w:
        raise ValueError("VP8L: width mismatch after inverse transforms")
    return argb.reshape(h, w)


def _argb_to_img(argb) -> np.ndarray:
    """uint32 ARGB (h, w) -> the tightest ndarray shape: gray (h, w) when
    opaque and r==g==b, else RGB, else RGBA — matching decode_png's
    shape conventions so CodecDecoder handles all formats uniformly."""
    a = (argb >> 24).astype(np.uint8)
    r = ((argb >> 16) & 0xFF).astype(np.uint8)
    g = ((argb >> 8) & 0xFF).astype(np.uint8)
    b = (argb & 0xFF).astype(np.uint8)
    if np.all(a == 255):
        if np.array_equal(r, g) and np.array_equal(g, b):
            return g
        return np.stack([r, g, b], axis=-1)
    return np.stack([r, g, b, a], axis=-1)


# ---------------------------------------------------------------------------
# container parsing
# ---------------------------------------------------------------------------


def _riff_chunks(data: bytes):
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP file")
    chunks = []
    pos = 12
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        chunks.append((tag, data[pos + 8 : pos + 8 + size]))
        pos += 8 + size + (size & 1)
    return chunks


def webp_info(data: bytes) -> dict:
    """Header-only probe: {'format': 'lossless'|'lossy'|'extended',
    'width', 'height', 'has_alpha'} without decoding pixel data."""
    chunks = _riff_chunks(data)
    tags = {t for t, _ in chunks}
    for tag, body in chunks:
        if tag == b"VP8X":
            flags = body[0]
            w = 1 + int.from_bytes(body[4:7], "little")
            h = 1 + int.from_bytes(body[7:10], "little")
            return {
                "format": "extended",
                "width": w,
                "height": h,
                "has_alpha": bool(flags & 0x10) or b"ALPH" in tags,
            }
        if tag == b"VP8L":
            br = _BitReader(body)
            if br.read(8) != 0x2F:
                raise ValueError("VP8L: bad signature byte")
            w = br.read(14) + 1
            h = br.read(14) + 1
            has_alpha = bool(br.read(1))
            return {"format": "lossless", "width": w, "height": h,
                    "has_alpha": has_alpha}
        if tag == b"VP8 ":
            # lossy keyframe header: 3-byte frame tag, start code, dims
            if body[3:6] != b"\x9d\x01\x2a":
                raise ValueError("VP8: bad keyframe start code")
            w = struct.unpack("<H", body[6:8])[0] & 0x3FFF
            h = struct.unpack("<H", body[8:10])[0] & 0x3FFF
            return {"format": "lossy", "width": w, "height": h,
                    "has_alpha": b"ALPH" in tags}
    raise ValueError("WebP: no image chunk found")


def decode_webp(data: bytes) -> np.ndarray:
    """Decode a WebP payload. Lossless (VP8L) files decode through the
    from-scratch pure-Python path; lossy (VP8) payloads decode via the
    system libwebp when present (functions/vp8_native.py, ctypes-gated —
    the VP8 keyframe format needs ~2000 exact RFC 6386 probability
    constants that the spec's prose alone cannot reconstruct), else the
    documented NotImplementedError (use decode_webp_alpha for the ALPH
    plane either way)."""
    for tag, body in _riff_chunks(data):
        if tag == b"VP8L":
            return _argb_to_img(_decode_vp8l_payload(body))
        if tag == b"VP8 ":
            from . import vp8_native

            if vp8_native.available():
                rgba = vp8_native.decode_rgba(data)
                # match the VP8L path's convention: drop an all-opaque
                # alpha channel, keep it otherwise
                if (rgba[..., 3] == 255).all():
                    return np.ascontiguousarray(rgba[..., :3])
                return rgba
            raise NotImplementedError(
                "WebP lossy (VP8) decode requires libwebp (not present); "
                "only lossless (VP8L) decodes in this environment"
            )
    raise ValueError("WebP: no image chunk found")


def decode_webp_alpha(data: bytes) -> np.ndarray:
    """Decode the ALPH chunk of an extended/lossy WebP into its (h, w)
    uint8 alpha plane. Compression 0 (raw) and 1 (VP8L-coded, alpha in
    the green channel) plus all four alpha filters are supported — this
    runs the full lossless entropy layer on real-web lossy files."""
    info = webp_info(data)
    w, h = info["width"], info["height"]
    alph = None
    for tag, body in _riff_chunks(data):
        if tag == b"ALPH":
            alph = body
            break
    if alph is None:
        raise ValueError("WebP: no ALPH chunk")
    b0 = alph[0]
    method = b0 & 3
    filt = (b0 >> 2) & 3
    if method == 0:
        plane = np.frombuffer(alph[1 : 1 + w * h], np.uint8).reshape(h, w).copy()
    elif method == 1:
        argb = _decode_vp8l_payload(alph[1:], header=False, alpha_w=w, alpha_h=h)
        plane = ((argb >> 8) & 0xFF).astype(np.uint8)
    else:
        raise ValueError(f"WebP: alpha compression method {method}")
    if filt:
        plane = plane.astype(np.int32)
        for y in range(h):
            for x in range(w):
                if x == 0 and y == 0:
                    p = 0
                elif y == 0:
                    p = plane[0, x - 1]
                elif x == 0:
                    p = plane[y - 1, 0]
                elif filt == 1:
                    p = plane[y, x - 1]
                elif filt == 2:
                    p = plane[y - 1, x]
                else:
                    g = int(plane[y, x - 1]) + int(plane[y - 1, x]) - int(
                        plane[y - 1, x - 1]
                    )
                    p = 0 if g < 0 else 255 if g > 255 else g
                plane[y, x] = (plane[y, x] + p) & 0xFF
        plane = plane.astype(np.uint8)
    return plane


# ---------------------------------------------------------------------------
# encoder (fixtures / round-trips)
# ---------------------------------------------------------------------------


def _huffman_lengths(freqs: dict, max_len: int = 15) -> dict:
    """Canonical Huffman code lengths from symbol frequencies; falls back
    to a balanced complete code if any length would exceed max_len."""
    import heapq

    syms = sorted(freqs)
    if len(syms) <= 1:
        raise ValueError("needs >= 2 symbols")
    heap = [(freqs[s], i) for i, s in enumerate(syms)]  # leaf id = index
    heapq.heapify(heap)
    nxt = len(syms)
    parent = {}
    while len(heap) > 1:
        f1, n1 = heapq.heappop(heap)
        f2, n2 = heapq.heappop(heap)
        parent[n1] = nxt
        parent[n2] = nxt
        heapq.heappush(heap, (f1 + f2, nxt))
        nxt += 1
    lengths = {}
    too_deep = False
    for i, s in enumerate(syms):
        d = 0
        n = i
        while n in parent:
            n = parent[n]
            d += 1
        lengths[s] = d
        if d > max_len:
            too_deep = True
    if too_deep:
        n = len(syms)
        ell = (n - 1).bit_length()
        m = (1 << ell) - n  # m symbols get length ell-1: complete code
        lengths = {s: (ell - 1 if i < m else ell) for i, s in enumerate(syms)}
    return lengths


def _write_code_bits(bw: _BitWriter, code: int, ln: int) -> None:
    bw.write(_rev_bits(code, ln), ln)  # prefix-code bits go MSB-first


def _canonical_codes(lengths: dict) -> dict:
    max_len = max(lengths.values())
    bl_count = [0] * (max_len + 1)
    for ln in lengths.values():
        bl_count[ln] += 1
    code = 0
    next_code = [0] * (max_len + 1)
    for ln in range(1, max_len + 1):
        code = (code + bl_count[ln - 1]) << 1
        next_code[ln] = code
    out = {}
    for s in sorted(lengths):
        ln = lengths[s]
        out[s] = (next_code[ln], ln)
        next_code[ln] += 1
    return out


def _write_prefix_code(bw: _BitWriter, lengths_by_sym: dict, alphabet: int):
    """Write one prefix code; returns {sym: (code, len)} for payload use.
    Chooses a simple code for 1-2 byte-valued symbols, else the normal
    code-length-coded form (zero runs via 17/18, repeats via 16)."""
    used = sorted(lengths_by_sym)
    if len(used) == 1 and used[0] < 256:
        s0 = used[0]
        bw.write(1, 1)
        bw.write(0, 1)  # num_symbols - 1
        if s0 <= 1:
            bw.write(0, 1)
            bw.write(s0, 1)
        else:
            bw.write(1, 1)
            bw.write(s0, 8)
        return {s0: (0, 0)}
    if len(used) == 2 and used[1] < 256 and set(
        lengths_by_sym.values()
    ) == {1}:
        s0, s1 = used
        bw.write(1, 1)
        bw.write(1, 1)
        if s0 <= 1:
            bw.write(0, 1)
            bw.write(s0, 1)
        else:
            bw.write(1, 1)
            bw.write(s0, 8)
        bw.write(s1, 8)
        return {s0: (0, 1), s1: (1, 1)}

    bw.write(0, 1)  # normal code
    lengths = [0] * alphabet
    for s, ln in lengths_by_sym.items():
        lengths[s] = ln
    # RLE the length array into code-length tokens
    tokens = []
    i = 0
    while i < alphabet:
        if lengths[i] == 0:
            run = 1
            while i + run < alphabet and lengths[i + run] == 0:
                run += 1
            i += run
            while run >= 11:
                r = min(run, 138)
                tokens.append((18, r - 11, 7))
                run -= r
            while run >= 3:
                r = min(run, 10)
                tokens.append((17, r - 3, 3))
                run -= r
            for _ in range(run):
                tokens.append((0, 0, 0))
        else:
            v = lengths[i]
            tokens.append((v, 0, 0))
            run = 0
            while i + 1 + run < alphabet and lengths[i + 1 + run] == v:
                run += 1
            i += 1 + run
            while run >= 3:
                r = min(run, 6)
                tokens.append((16, r - 3, 2))
                run -= r
            for _ in range(run):
                tokens.append((v, 0, 0))
    cl_freq = {}
    for t, _, _ in tokens:
        cl_freq[t] = cl_freq.get(t, 0) + 1
    if len(cl_freq) == 1:
        # pad with an unused symbol so the CL code is complete
        pad = 0 if 0 not in cl_freq else 1
        cl_lengths = {next(iter(cl_freq)): 1, pad: 1}
    else:
        cl_lengths = _huffman_lengths(cl_freq, max_len=7)
    cl_codes = _canonical_codes(cl_lengths)
    num_cl = max(
        4, max(i + 1 for i, s in enumerate(_CL_ORDER) if s in cl_lengths)
    )
    bw.write(num_cl - 4, 4)
    for i in range(num_cl):
        bw.write(cl_lengths.get(_CL_ORDER[i], 0), 3)
    bw.write(0, 1)  # no explicit max_symbol
    for t, extra, nbits in tokens:
        c, ln = cl_codes[t]
        _write_code_bits(bw, c, ln)
        if nbits:
            bw.write(extra, nbits)
    return _canonical_codes(lengths_by_sym)


def _forward_predictor(argb, w: int, h: int, mode: int):
    out = argb.copy()
    src = argb
    i = 0
    for y in range(h):
        for x in range(w):
            if y == 0 and x == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = int(src[i - 1])
            elif x == 0:
                pred = int(src[i - w])
            else:
                pred = _predict(mode, src, i, w)
            p = int(src[i])
            r = 0
            for sh in (24, 16, 8, 0):
                r |= ((((p >> sh) & 0xFF) - ((pred >> sh) & 0xFF)) & 0xFF) << sh
            out[i] = r
            i += 1
    return out


def _forward_color_transform(argb, g2r: int, g2b: int, r2b: int):
    out = argb.copy()
    for i in range(len(argb)):
        px = int(argb[i])
        g = (px >> 8) & 0xFF
        r0 = (px >> 16) & 0xFF
        b0 = px & 0xFF
        r = (r0 - _ct_delta(g2r, g)) & 0xFF
        b = (b0 - _ct_delta(g2b, g) - _ct_delta(r2b, r0)) & 0xFF
        out[i] = (px & 0xFF00FF00) | (r << 16) | b
    return out


def _tokenize(argb, w: int, use_lz77: bool, cache_bits: int):
    """Pixel array -> token list; mirrors the decoder's cache exactly."""
    cache_size = (1 << cache_bits) if cache_bits else 0
    cache = [0] * cache_size if cache_size else None
    written = bytearray(cache_size)  # only reference slots we wrote
    shift = 32 - cache_bits if cache_bits else 0
    tokens = []
    n = len(argb)
    pos = 0

    def insert(px):
        if cache is not None:
            k = (_HASH_MUL * px & 0xFFFFFFFF) >> shift
            cache[k] = px
            written[k] = 1

    while pos < n:
        px = int(argb[pos])
        if use_lz77 and pos >= 1:
            run = 0
            while pos + run < n and int(argb[pos + run]) == int(
                argb[pos + run - 1]
            ):
                run += 1
            if run >= 3:
                run = min(run, 4096)
                tokens.append(("copy", run, 1))
                for k in range(run):
                    insert(int(argb[pos + k]))
                pos += run
                continue
        if use_lz77 and pos >= w:
            run = 0
            while pos + run < n and int(argb[pos + run]) == int(
                argb[pos + run - w]
            ):
                run += 1
            if run >= 4:
                run = min(run, 4096)
                tokens.append(("copy", run, w))
                for k in range(run):
                    insert(int(argb[pos + k]))
                pos += run
                continue
        if cache is not None:
            k = (_HASH_MUL * px & 0xFFFFFFFF) >> shift
            if written[k] and cache[k] == px:
                tokens.append(("cache", k))
                insert(px)
                pos += 1
                continue
        tokens.append(("lit", px))
        insert(px)
        pos += 1
    return tokens


def _dist_to_code(dist: int, w: int) -> int:
    """Plain distance -> distance-code value; prefers a neighbor-map code
    when one addresses this (dist, xsize) pair (validates the map)."""
    for i, (dx, dy) in enumerate(_DIST_MAP):
        d = dy * w + dx
        if d == dist and d >= 1:
            return i + 1
    return dist + 120


def _write_image_stream(bw: _BitWriter, argb, w: int, h: int, *,
                        use_lz77: bool = False, cache_bits: int = 0,
                        level0: bool = False):
    """Write one spatially-coded image (no transforms — callers write
    transform headers themselves; sub-images always come through here).
    Only level-0 streams carry the meta-prefix flag."""
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    cache_size = (1 << cache_bits) if cache_bits else 0
    tokens = _tokenize(argb, w, use_lz77, cache_bits)

    freq = [dict(), dict(), dict(), dict(), dict()]  # green,red,blue,alpha,dist

    def bump(d, s):
        d[s] = d.get(s, 0) + 1

    for t in tokens:
        if t[0] == "lit":
            a, r, g, b = _chan(t[1])
            bump(freq[0], g)
            bump(freq[1], r)
            bump(freq[2], b)
            bump(freq[3], a)
        elif t[0] == "copy":
            ls, _, _ = _lz77_sym(t[1])
            bump(freq[0], 256 + ls)
            ds, _, _ = _lz77_sym(_dist_to_code(t[2], w))
            bump(freq[4], ds)
        else:
            bump(freq[0], 256 + 24 + t[1])
    for d, default in zip(freq, (0, 0, 0, 255, 0)):
        if not d:
            d[default] = 1  # unused alphabet: cheapest 1-symbol simple code

    alphabets = (256 + 24 + cache_size, 256, 256, 256, 40)
    codes = []
    if level0:
        bw.write(0, 1)  # no meta prefix image (single group)
    for d, alpha_size in zip(freq, alphabets):
        if len(d) == 1:
            s = next(iter(d))
            if s < 256:
                codes.append(_write_prefix_code(bw, {s: 0}, alpha_size))
            else:
                # symbol not expressible in a simple code: pad with sym 0
                codes.append(
                    _write_prefix_code(bw, {0: 1, s: 1}, alpha_size)
                )
        else:
            codes.append(
                _write_prefix_code(bw, _huffman_lengths(d), alpha_size)
            )
    gc, rc, bc, ac, dc = codes

    def emit(code_map, s):
        c, ln = code_map[s]
        if ln:
            _write_code_bits(bw, c, ln)

    for t in tokens:
        if t[0] == "lit":
            a, r, g, b = _chan(t[1])
            emit(gc, g)
            emit(rc, r)
            emit(bc, b)
            emit(ac, a)
        elif t[0] == "copy":
            ls, extra, nbits = _lz77_sym(t[1])
            emit(gc, 256 + ls)
            if nbits:
                bw.write(extra, nbits)
            dv = _dist_to_code(t[2], w)
            ds, extra, nbits = _lz77_sym(dv)
            emit(dc, ds)
            if nbits:
                bw.write(extra, nbits)
        else:
            emit(gc, 256 + 24 + t[1])


def _img_to_argb(img: np.ndarray):
    img = np.asarray(img)
    if img.ndim == 2:
        r = g = b = img.astype(np.uint32)
        a = np.full(img.shape, 255, np.uint32)
    elif img.shape[2] == 3:
        r, g, b = (img[..., k].astype(np.uint32) for k in range(3))
        a = np.full(img.shape[:2], 255, np.uint32)
    else:
        r, g, b, a = (img[..., k].astype(np.uint32) for k in range(4))
    return ((a << 24) | (r << 16) | (g << 8) | b).reshape(-1), img.shape[:2]


def encode_webp_lossless(img: np.ndarray, *, subtract_green: bool = False,
                         predictor: int | None = None,
                         color_transform: tuple | None = None,
                         palette: bool = False, use_lz77: bool = False,
                         cache_bits: int = 0) -> bytes:
    """Lossless WebP (VP8L) writer for fixtures and round-trip tests.

    img: uint8 (h, w) gray, (h, w, 3) RGB or (h, w, 4) RGBA.
    Options select which decoder paths the stream exercises:
    subtract_green/predictor (uniform mode 0-13)/color_transform
    ((g2r, g2b, r2b) uniform block) compose; palette replaces them
    (index bundling kicks in automatically at <= 16 colors)."""
    argb, (h, w) = _img_to_argb(img)
    has_alpha = bool(np.any(argb >> 24 != 255))

    bw = _BitWriter()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1 if has_alpha else 0, 1)
    bw.write(0, 3)

    main_w = w
    if palette:
        colors, inv = np.unique(argb, return_inverse=True)
        n_colors = len(colors)
        if n_colors > 256:
            raise ValueError("palette: > 256 distinct colors")
        if subtract_green or predictor is not None or color_transform:
            raise ValueError("palette does not compose with other options")
        bw.write(1, 1)
        bw.write(3, 2)
        bw.write(n_colors - 1, 8)
        deltas = np.zeros(n_colors, np.uint32)
        prev = 0
        for i, c in enumerate(colors):
            d = 0
            for sh in (24, 16, 8, 0):
                d |= ((((int(c) >> sh) & 0xFF) - ((prev >> sh) & 0xFF)) & 0xFF) << sh
            deltas[i] = d
            prev = int(c)
        _write_image_stream(bw, deltas, n_colors, 1)
        if n_colors <= 2:
            xbits = 3
        elif n_colors <= 4:
            xbits = 2
        elif n_colors <= 16:
            xbits = 1
        else:
            xbits = 0
        idx = inv.astype(np.uint32).reshape(h, w)
        if xbits:
            per = 1 << xbits
            depth = 8 >> xbits
            pw = _div_up(w, per)
            packed = np.zeros((h, pw), np.uint32)
            for k in range(per):
                cols = np.arange(k, w, per)
                packed[:, : len(cols)] |= idx[:, cols] << (k * depth)
            idx = packed
            main_w = pw
        argb = (idx << 8).reshape(-1)
    else:
        if subtract_green:
            bw.write(1, 1)
            bw.write(2, 2)
            g = (argb >> 8) & 0xFF
            r = (((argb >> 16) & 0xFF) - g) & 0xFF
            b = ((argb & 0xFF) - g) & 0xFF
            argb = (argb & 0xFF00FF00) | (r << 16) | b
        if color_transform is not None:
            g2r, g2b, r2b = color_transform
            bw.write(1, 1)
            bw.write(1, 2)
            size_bits = max(2, min(9, max(w - 1, h - 1, 1).bit_length()))
            bw.write(size_bits - 2, 3)
            bwk = _div_up(w, 1 << size_bits)
            bhk = _div_up(h, 1 << size_bits)
            cte = np.full(
                bwk * bhk,
                ((r2b & 0xFF) << 16) | ((g2b & 0xFF) << 8) | (g2r & 0xFF),
                np.uint32,
            )
            _write_image_stream(bw, cte, bwk, bhk)
            argb = _forward_color_transform(argb, g2r & 0xFF, g2b & 0xFF,
                                            r2b & 0xFF)
        if predictor is not None:
            if not 0 <= predictor <= 13:
                raise ValueError("predictor mode must be 0..13")
            bw.write(1, 1)
            bw.write(0, 2)
            size_bits = max(2, min(9, max(w - 1, h - 1, 1).bit_length()))
            bw.write(size_bits - 2, 3)
            bwk = _div_up(w, 1 << size_bits)
            bhk = _div_up(h, 1 << size_bits)
            modes = np.full(bwk * bhk, predictor << 8, np.uint32)
            _write_image_stream(bw, modes, bwk, bhk)
            argb = _forward_predictor(argb, w, h, predictor)
    bw.write(0, 1)  # end of transforms

    _write_image_stream(bw, argb, main_w, h, use_lz77=use_lz77,
                        cache_bits=cache_bits, level0=True)
    payload = bw.finish()

    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
