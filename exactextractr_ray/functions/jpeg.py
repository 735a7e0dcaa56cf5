"""Baseline JPEG (ITU-T T.81) codec in pure numpy + stdlib.

The container has no libjpeg/PIL, but baseline sequential-DCT Huffman JPEG
is fully specified in the public ITU-T T.81 / ISO 10918-1 standard, so both
directions are implemented from the spec:

* ``decode_jpeg`` — marker parse (SOI/APPn/DQT/DHT/SOF/DRI/SOS/RSTn/EOI),
  LUT-based Huffman decode (16-bit peek table), dequantize + inverse zigzag,
  vectorized 8x8 IDCT (one einsum per component over all blocks), chroma
  upsampling by sample replication, JFIF YCbCr->RGB. Supports baseline
  (SOF0/1, single- or multi-scan) AND progressive (SOF2, Annex G.2: DC/AC
  first + successive-approximation refinement scans with EOB runs) frames,
  grayscale and 3-component, any integer sampling factors, restart
  intervals, and abbreviated streams (tables supplied separately — the
  TIFF ``JPEGTables`` tag contract from TIFF Technote 2).
* ``encode_jpeg`` — baseline only: Annex K quantization + Huffman tables
  scaled by the public IJG quality curve, 4:4:4 or 4:2:0 subsampling,
  vectorized FDCT, per-block Huffman entropy writer with byte stuffing.

Limits (explicit): 8-bit DCT frames only — arithmetic coding,
hierarchical, lossless and 12-bit frames raise NotImplementedError.
Chroma upsampling is sample replication (not libjpeg's "fancy" linear
interpolation), so pixel output for subsampled images is deterministic but
may differ from libjpeg by a few LSBs near chroma edges; the decoder is
exact (bit-identical to any conformant decoder) for 4:4:4 and grayscale
streams, where no upsampling happens.

Everything here is public-spec knowledge: T.81 Annexes C (Huffman code
construction), F (decode procedures), K (example tables); JFIF 1.02 for the
color transform. Reference parity: the reference package reads JPEG-in-TIFF
rasters through GDAL (gdal_raster_wrapper.cpp:22-95); this module gives the
pure-Python GeoTIFF reader the same capability (compression code 7).
"""

from __future__ import annotations

import re
import struct

import numpy as np

# Zigzag scan: ZIGZAG[k] = natural (row*8+col) index of the k-th coefficient
# in zigzag order (T.81 Figure 5).
ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Orthonormal 8-point DCT-II basis: C[u, x] = a(u) cos((2x+1)u pi/16).
# spatial = C.T @ F @ C ; F = C @ spatial @ C.T
_C = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _a = np.sqrt(0.125) if _u == 0 else 0.5
        _C[_u, _x] = _a * np.cos((2 * _x + 1) * _u * np.pi / 16.0)
del _u, _x, _a

# ---- Annex K example tables (T.81 Tables K.1-K.6) ----

QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)

QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# (BITS[1..16], HUFFVAL) per T.81 Annex K.3
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))

AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


# ---------------- Huffman (decode LUT + encode map) ----------------


class _HuffDecode:
    """16-bit-peek Huffman LUT (T.81 Annex C code assignment): one index
    per symbol instead of a bit-by-bit tree walk. Stored as ``bytes`` —
    indexing bytes yields Python ints directly, which is markedly faster
    in the per-coefficient hot loop than numpy scalar extraction."""

    __slots__ = ("lut_sym", "lut_len")

    def __init__(self, bits: list[int], vals: list[int]):
        if sum(bits) != len(vals):
            raise ValueError("DHT counts do not match symbol count")
        sym = np.zeros(1 << 16, dtype=np.uint8)
        ln = np.zeros(1 << 16, dtype=np.uint8)
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                lo = code << (16 - length)
                hi = (code + 1) << (16 - length)
                sym[lo:hi] = vals[k]
                ln[lo:hi] = length
                code += 1
                k += 1
            code <<= 1
        self.lut_sym = sym.tobytes()
        self.lut_len = ln.tobytes()


_HUFF_CACHE: dict[bytes, _HuffDecode] = {}


def _huff_cached(key: bytes, bits: list[int], vals: list[int]) -> _HuffDecode:
    """Per-process LUT cache keyed by the raw DHT payload: building the
    2^16-entry peek tables costs ~1 ms x4 tables, which dominates decode
    of small images (thumbnails use the same Annex K tables everywhere).
    Bounded: distinct custom tables in a corpus are few; cap at 256."""
    tbl = _HUFF_CACHE.get(key)
    if tbl is None:
        tbl = _HuffDecode(bits, vals)
        if len(_HUFF_CACHE) < 256:
            _HUFF_CACHE[key] = tbl
    return tbl


def _huff_encode_map(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitReader:
    """MSB-first bit reader over an unstuffed entropy segment. Reads past
    the end return 1-bits (T.81 F.2.2.5 padding convention)."""

    __slots__ = ("buf", "n", "pos", "acc", "nbits")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.n = len(buf)
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self):
        while self.nbits <= 24:
            if self.pos < self.n:
                self.acc = (self.acc << 8) | self.buf[self.pos]
                self.pos += 1
            else:
                self.acc = (self.acc << 8) | 0xFF
            self.nbits += 8

    def peek16(self) -> int:
        if self.nbits < 16:
            self._fill()
        return (self.acc >> (self.nbits - 16)) & 0xFFFF

    def skip(self, k: int):
        self.nbits -= k
        self.acc &= (1 << self.nbits) - 1

    def get(self, k: int) -> int:
        if k == 0:
            return 0
        if self.nbits < k:
            self._fill()
        v = (self.acc >> (self.nbits - k)) & ((1 << k) - 1)
        self.nbits -= k
        self.acc &= (1 << self.nbits) - 1
        return v

    def read_sym(self, tbl: _HuffDecode, what: str) -> int:
        """Fused peek16 + LUT + skip: one call per Huffman symbol."""
        if self.nbits < 16:
            self._fill()
        v16 = (self.acc >> (self.nbits - 16)) & 0xFFFF
        ln = tbl.lut_len[v16]
        if ln == 0:
            raise ValueError(f"invalid JPEG Huffman code ({what})")
        self.nbits -= ln
        self.acc &= (1 << self.nbits) - 1
        return tbl.lut_sym[v16]

    def recv_extend(self, s: int) -> int:
        """Fused get(s) + T.81 F.12 EXTEND."""
        if s == 0:
            return 0
        if self.nbits < s:
            self._fill()
        v = (self.acc >> (self.nbits - s)) & ((1 << s) - 1)
        self.nbits -= s
        self.acc &= (1 << self.nbits) - 1
        if v < (1 << (s - 1)):
            v -= (1 << s) - 1
        return v


class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int):
        self.acc = (self.acc << length) | code
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)


# ---------------- decoder ----------------


class _Component:
    __slots__ = ("cid", "h", "v", "tq", "td", "ta")


class _DecodeState:
    def __init__(self):
        self.qt: dict[int, np.ndarray] = {}       # Tq -> natural-order int64[64]
        self.huff_dc: dict[int, _HuffDecode] = {}
        self.huff_ac: dict[int, _HuffDecode] = {}
        self.restart_interval = 0
        self.width = self.height = 0
        self.comps: list[_Component] = []
        self.progressive = False


def _parse_headers(data: bytes, state: _DecodeState, pos: int) -> tuple:
    """Walk markers from ``pos`` handling table/frame segments. Stops at the
    next SOS — returns ``(scan_dict, entropy_offset)`` — or at EOI / end of
    stream — returns ``(None, -1)``."""
    n = len(data)
    while pos + 2 <= n:
        if data[pos] != 0xFF:
            raise ValueError(f"JPEG marker sync lost at {pos}")
        marker = data[pos + 1]
        if marker == 0xFF:  # fill byte
            pos += 1
            continue
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:  # bare markers
            continue
        if marker == 0xD9:  # EOI
            return None, -1
        if pos + 2 > n:
            break
        (seglen,) = struct.unpack(">H", data[pos:pos + 2])
        seg = data[pos + 2:pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                i += 1
                if pq == 0:
                    tbl = np.frombuffer(seg[i:i + 64], dtype=np.uint8).astype(np.int64)
                    i += 64
                else:
                    tbl = np.frombuffer(seg[i:i + 128], dtype=">u2").astype(np.int64)
                    i += 128
                nat = np.empty(64, dtype=np.int64)
                nat[ZIGZAG] = tbl  # stored in zigzag order -> natural
                state.qt[tq] = nat
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                bits = list(seg[i + 1:i + 17])
                nv = sum(bits)
                vals = list(seg[i + 17:i + 17 + nv])
                tbl = _huff_cached(seg[i + 1:i + 17 + nv], bits, vals)
                i += 17 + nv
                if tc == 0:
                    state.huff_dc[th] = tbl
                else:
                    state.huff_ac[th] = tbl
        elif marker == 0xDD:  # DRI
            (state.restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 progressive
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise NotImplementedError(f"JPEG precision {prec} (8 only)")
            state.height, state.width = h, w
            state.progressive = marker == 0xC2
            state.comps = []
            for ci in range(nc):
                c = _Component()
                c.cid = seg[6 + 3 * ci]
                hv = seg[7 + 3 * ci]
                c.h, c.v = hv >> 4, hv & 15
                c.tq = seg[8 + 3 * ci]
                state.comps.append(c)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(f"JPEG SOF marker 0x{marker:02x} unsupported")
        elif marker == 0xDA:  # SOS
            if not state.comps:
                raise ValueError("JPEG scan before frame header")
            ns = seg[0]
            scomps = []
            for si in range(ns):
                cs, tdta = seg[1 + 2 * si], seg[2 + 2 * si]
                for ci, c in enumerate(state.comps):
                    if c.cid == cs:
                        c.td, c.ta = tdta >> 4, tdta & 15
                        scomps.append((ci, c))
                        break
                else:
                    raise ValueError(f"SOS references unknown component {cs}")
            ss, se, ahal = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            scan = {"comps": scomps, "ss": ss, "se": se,
                    "ah": ahal >> 4, "al": ahal & 15}
            return scan, pos
        # APPn/COM and anything else: skipped
    return None, -1


_SCAN_END = re.compile(rb"\xff(?=[^\x00\xd0-\xd7\xff])")
_RST_SPLIT = re.compile(rb"\xff[\xd0-\xd7]")


def _decode_scan(data: bytes, pos: int, state: _DecodeState, scan: dict,
                 coefs: list, geom: dict) -> int:
    """Entropy-decode one scan into the coefficient stores; returns the
    offset of the marker following the scan. Handles baseline full-band
    scans and all four progressive scan kinds (T.81 Annex G.2): DC
    first/refinement, AC first/refinement with EOB runs."""
    m = _SCAN_END.search(data, pos)
    end = m.start() if m else len(data)
    segments = [s.replace(b"\xff\x00", b"\xff")
                for s in _RST_SPLIT.split(data[pos:end])]

    scomps = scan["comps"]
    ss, se, ah, al = scan["ss"], scan["se"], scan["ah"], scan["al"]
    progressive = state.progressive
    ns = len(scomps)
    if progressive:
        if ss == 0 and se != 0:
            raise ValueError("progressive DC scan with Se != 0")
        if ss > 0 and ns != 1:
            raise ValueError("progressive AC scan must be single-component")
    mcus_x, mcus_y = geom["mcus_x"], geom["mcus_y"]
    if ns == 1:
        ci0, c0 = scomps[0]
        nx, ny = geom["bw_used"][ci0], geom["bh_used"][ci0]
        n_mcus = nx * ny
    else:
        nx, ny = mcus_x, mcus_y
        n_mcus = mcus_x * mcus_y

    ri = state.restart_interval
    seg_i = 0
    br = _BitReader(segments[0])
    pred = [0] * len(state.comps)
    eobrun = 0

    dc_scan = ss == 0
    full_band = dc_scan and not progressive  # baseline: DC + AC 1..63
    ac_lo = 1 if full_band else ss
    ac_hi = 63 if full_band else se
    p1 = 1 << al

    for mcu in range(n_mcus):
        if ri and mcu and mcu % ri == 0:
            seg_i += 1
            if seg_i >= len(segments):
                raise ValueError("JPEG truncated: missing restart segment")
            br = _BitReader(segments[seg_i])
            pred = [0] * len(state.comps)
            eobrun = 0
        my, mx = divmod(mcu, nx)
        for ci, c in scomps:
            reps = c.h * c.v if ns > 1 else 1
            for r in range(reps):
                if ns > 1:
                    by = my * c.v + r // c.h
                    bx = mx * c.h + r % c.h
                else:
                    by, bx = my, mx
                blk = coefs[ci][by, bx]
                if dc_scan:
                    if ah == 0:  # DC first (or baseline)
                        s = br.read_sym(state.huff_dc[c.td], "DC")
                        pred[ci] += br.recv_extend(s)
                        blk[0] = pred[ci] << al
                    else:  # DC refinement: one correction bit
                        if br.get(1):
                            blk[0] |= p1
                        continue
                    if not full_band:
                        continue
                hac = state.huff_ac[c.ta]
                if ah == 0:  # AC first scan (or baseline AC band)
                    if eobrun:
                        eobrun -= 1
                        continue
                    k = ac_lo
                    while k <= ac_hi:
                        rs = br.read_sym(hac, "AC")
                        rr, sz = rs >> 4, rs & 15
                        if sz == 0:
                            if rr != 15:  # EOBn: run of (1<<rr)+ext blocks
                                eobrun = (1 << rr) - 1
                                if rr:
                                    eobrun += br.get(rr)
                                break
                            k += 16  # ZRL
                            continue
                        k += rr
                        if k > ac_hi:
                            raise ValueError("JPEG AC run overflows band")
                        blk[k] = br.recv_extend(sz) << al
                        k += 1
                else:  # AC refinement (T.81 G.1.2.3)
                    # operate on a Python-list view of the band: history
                    # reads are per-coefficient and list indexing is far
                    # cheaper than numpy scalar access in this hot loop
                    band = blk[ss:se + 1].tolist()
                    nb = se - ss + 1
                    j = 0
                    if eobrun == 0:
                        while j < nb:
                            rs = br.read_sym(hac, "AC")
                            rr, sz = rs >> 4, rs & 15
                            newval = 0
                            if sz == 0:
                                if rr != 15:
                                    eobrun = 1 << rr
                                    if rr:
                                        eobrun += br.get(rr)
                                    break
                                # ZRL: pass 16 zero-history coefficients
                            else:
                                newval = p1 if br.get(1) else -p1
                            while j < nb:
                                cur = band[j]
                                if cur != 0:
                                    if br.get(1) and (cur & p1) == 0:
                                        band[j] = cur + (p1 if cur > 0 else -p1)
                                else:
                                    if rr == 0:
                                        break
                                    rr -= 1
                                j += 1
                            if newval and j < nb:
                                band[j] = newval
                            j += 1
                    if eobrun > 0:
                        while j < nb:
                            cur = band[j]
                            if cur != 0 and br.get(1) and (cur & p1) == 0:
                                band[j] = cur + (p1 if cur > 0 else -p1)
                            j += 1
                        eobrun -= 1
                    blk[ss:se + 1] = band
    return end


def decode_jpeg(data: bytes, tables: bytes | None = None) -> np.ndarray:
    """Baseline or progressive JPEG bytes -> uint8 (h, w) gray or
    (h, w, 3) RGB.

    ``tables`` is an optional abbreviated tables-only stream (SOI, DQT/DHT,
    EOI) applied before the image stream — the TIFF ``JPEGTables`` (tag 347)
    contract; tables in the image stream itself override.
    """
    state = _DecodeState()
    if tables is not None:
        if tables[:2] != b"\xff\xd8":
            raise ValueError("not a JPEG tables stream: missing SOI")
        scan, _ = _parse_headers(tables, state, 2)
        if scan is not None:
            raise ValueError("JPEG tables stream contains a scan")
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: missing SOI")

    pos = 2
    coefs: list | None = None
    geom: dict | None = None
    nscans = 0
    while True:
        scan, pos = _parse_headers(data, state, pos)
        if scan is None:
            break
        if coefs is None:
            comps = state.comps
            hmax = max(c.h for c in comps)
            vmax = max(c.v for c in comps)
            w, h = state.width, state.height
            mcus_x = -(-w // (8 * hmax))
            mcus_y = -(-h // (8 * vmax))
            geom = {
                "hmax": hmax, "vmax": vmax,
                "mcus_x": mcus_x, "mcus_y": mcus_y,
                # blocks actually coded by a non-interleaved scan: the
                # component's own ceil dimensions (T.81 A.2.2)
                "bw_used": [-(-(-(-w * c.h // hmax)) // 8) for c in comps],
                "bh_used": [-(-(-(-h * c.v // vmax)) // 8) for c in comps],
            }
            coefs = [
                np.zeros((mcus_y * c.v, mcus_x * c.h, 64), dtype=np.int32)
                for c in comps
            ]
        pos = _decode_scan(data, pos, state, scan, coefs, geom)
        nscans += 1
    if coefs is None:
        raise ValueError("JPEG stream has no scan (tables-only?)")
    comps = state.comps
    hmax, vmax = geom["hmax"], geom["vmax"]
    w, h = state.width, state.height

    # dequantize + inverse zigzag + IDCT, vectorized per component
    planes = []
    for ci, c in enumerate(comps):
        qt = state.qt[c.tq]
        by, bx, _ = coefs[ci].shape
        # coefficients were stored zigzag-indexed: dequantize with the
        # zigzag view of the (natural-order) table, then un-zigzag
        dq = coefs[ci].reshape(-1, 64).astype(np.float64) * qt[ZIGZAG][np.newaxis, :]
        nat = np.zeros_like(dq)
        nat[:, ZIGZAG] = dq
        F = nat.reshape(-1, 8, 8)
        spatial = np.einsum("ux,nuv,vy->nxy", _C, F, _C, optimize=True) + 128.0
        spatial = np.clip(np.round(spatial), 0, 255).astype(np.uint8)
        plane = (
            spatial.reshape(by, bx, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(by * 8, bx * 8)
        )
        # upsample to full resolution by replication, crop to (h, w)
        ry, rx = vmax // c.v, hmax // c.h
        if ry > 1:
            plane = np.repeat(plane, ry, axis=0)
        if rx > 1:
            plane = np.repeat(plane, rx, axis=1)
        planes.append(plane[:h, :w])

    if len(comps) == 1:
        return planes[0]
    if len(comps) != 3:
        raise NotImplementedError(f"{len(comps)}-component JPEG unsupported")
    y = planes[0].astype(np.float64)
    cb = planes[1].astype(np.float64) - 128.0
    cr = planes[2].astype(np.float64) - 128.0
    rgb = np.stack(
        [
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ],
        axis=-1,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------- encoder ----------------


def _quality_scale(qt: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality curve (public libjpeg convention)."""
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((qt * scale + 50) // 100, 1, 255)


def _encode_block(bw: _BitWriter, q: np.ndarray, pred: int,
                  dcmap: dict, acmap: dict) -> int:
    """q: int64[64] quantized coefficients in NATURAL order."""
    zz = q[ZIGZAG]
    dc = int(zz[0])
    diff = dc - pred
    mag = abs(diff)
    s = mag.bit_length()
    code, ln = dcmap[s]
    bw.put(code, ln)
    if s:
        bw.put(diff if diff > 0 else diff + (1 << s) - 1, s)
    nz = np.nonzero(zz[1:])[0] + 1
    k = 1
    for idx in nz.tolist():
        run = idx - k
        while run >= 16:
            code, ln = acmap[0xF0]  # ZRL
            bw.put(code, ln)
            run -= 16
        v = int(zz[idx])
        s = abs(v).bit_length()
        code, ln = acmap[(run << 4) | s]
        bw.put(code, ln)
        bw.put(v if v > 0 else v + (1 << s) - 1, s)
        k = idx + 1
    if k < 64:
        code, ln = acmap[0x00]  # EOB
        bw.put(code, ln)
    return dc


def _plane_blocks(plane: np.ndarray) -> np.ndarray:
    """uint8 (H, W) padded to multiples of 8 by edge replication ->
    quant-ready float blocks (by, bx, 8, 8)."""
    H, W = plane.shape
    ph, pw = -(-H // 8) * 8, -(-W // 8) * 8
    if (ph, pw) != (H, W):
        plane = np.pad(plane, ((0, ph - H), (0, pw - W)), mode="edge")
    by, bx = ph // 8, pw // 8
    return plane.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3).astype(np.float64)


def _fdct_quant(blocks: np.ndarray, qt: np.ndarray) -> np.ndarray:
    by, bx = blocks.shape[:2]
    F = np.einsum("ux,nxy,vy->nuv", _C, blocks.reshape(-1, 8, 8) - 128.0, _C,
                  optimize=True)
    q = np.round(F.reshape(-1, 64) / qt[np.newaxis, :]).astype(np.int64)
    return q.reshape(by, bx, 64)


def _marker(code: int, payload: bytes) -> bytes:
    return bytes([0xFF, code]) + struct.pack(">H", len(payload) + 2) + payload


def _dqt_payload(tq: int, qt_nat: np.ndarray) -> bytes:
    return bytes([tq]) + bytes(qt_nat[ZIGZAG].astype(np.uint8).tolist())


def _dht_payload(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
    return bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)


def encode_jpeg(img: np.ndarray, quality: int = 85,
                subsampling: str = "4:2:0", include_tables: bool = True,
                restart_interval: int = 0) -> bytes:
    """uint8 (h, w) gray or (h, w, 3) RGB -> baseline JFIF JPEG bytes.

    Annex K tables scaled by the IJG quality curve; ``subsampling`` is
    "4:2:0" (2x2 chroma averaging) or "4:4:4". ``include_tables=False``
    omits the DQT/DHT markers, producing the abbreviated image stream TIFF
    Technote 2 pairs with a ``JPEGTables`` tag (decode with
    ``tables=encode_jpeg_tables(...)`` at the SAME quality).
    ``restart_interval=r`` emits a DRI marker and an RSTn marker every r
    MCUs (T.81 F.1.2.3 — predictor reset + byte alignment).
    """
    img = np.asarray(img)
    if img.dtype != np.uint8:
        raise ValueError("encode_jpeg needs uint8 input")
    gray = img.ndim == 2
    if not gray and (img.ndim != 3 or img.shape[2] != 3):
        raise ValueError(f"unsupported image shape {img.shape}")
    h, w = img.shape[:2]
    qt_l = _quality_scale(QT_LUMA, quality)
    qt_c = _quality_scale(QT_CHROMA, quality)
    dc_l = _huff_encode_map(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _huff_encode_map(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _huff_encode_map(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _huff_encode_map(AC_CHROMA_BITS, AC_CHROMA_VALS)

    if gray:
        y_plane = img
        samp = [(1, 1)]
        planes = [y_plane]
    else:
        rgbf = img.astype(np.float64)
        r, g, b = rgbf[:, :, 0], rgbf[:, :, 1], rgbf[:, :, 2]
        yp = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        yp, cb, cr = (np.clip(np.round(p), 0, 255).astype(np.uint8)
                      for p in (yp, cb, cr))
        if subsampling == "4:2:0":
            # pad to even dims (edge), then 2x2 mean
            ph, pw = -(-h // 2) * 2, -(-w // 2) * 2
            def _sub(p):
                if (ph, pw) != (h, w):
                    p = np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
                q = p.reshape(ph // 2, 2, pw // 2, 2).astype(np.float64)
                return np.clip(np.round(q.mean(axis=(1, 3))), 0, 255).astype(np.uint8)
            cb, cr = _sub(cb), _sub(cr)
            samp = [(2, 2), (1, 1), (1, 1)]
        elif subsampling == "4:4:4":
            samp = [(1, 1), (1, 1), (1, 1)]
        else:
            raise ValueError(f"subsampling {subsampling!r} (4:2:0 or 4:4:4)")
        planes = [yp, cb, cr]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    # quantized blocks per component, padded to MCU multiples
    qblocks = []
    for (sh, sv), plane, qt in zip(
        samp, planes, [qt_l] + [qt_c] * (len(planes) - 1)
    ):
        need_y, need_x = mcus_y * sv * 8, mcus_x * sh * 8
        H, W = plane.shape
        if (H, W) != (need_y, need_x):
            plane = np.pad(
                plane, ((0, need_y - H), (0, need_x - W)), mode="edge"
            )
        qblocks.append(_fdct_quant(_plane_blocks(plane), qt))

    bw = _BitWriter()
    entropy = bytearray()
    pred = [0] * len(planes)
    interleaved = len(planes) > 1
    ri = int(restart_interval)
    rst = 0
    for mcu in range(mcus_x * mcus_y):
        if ri and mcu and mcu % ri == 0:
            bw.flush()
            entropy += bw.out
            entropy += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) & 7
            bw = _BitWriter()
            pred = [0] * len(planes)
        my, mx = divmod(mcu, mcus_x)
        for ci, (sh, sv) in enumerate(samp):
            dcm = dc_l if ci == 0 else dc_c
            acm = ac_l if ci == 0 else ac_c
            reps = sh * sv if interleaved else 1
            for rrep in range(reps):
                by = my * sv + rrep // sh
                bx = mx * sh + rrep % sh
                pred[ci] = _encode_block(
                    bw, qblocks[ci][by, bx], pred[ci], dcm, acm
                )
    bw.flush()
    entropy += bw.out

    out = bytearray(b"\xff\xd8")  # SOI
    out += _marker(0xE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00")
    if include_tables:
        out += _marker(0xDB, _dqt_payload(0, qt_l))
        if not gray:
            out += _marker(0xDB, _dqt_payload(1, qt_c))
    sof = struct.pack(">BHHB", 8, h, w, len(planes))
    for ci, (sh, sv) in enumerate(samp):
        sof += bytes([ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1])
    out += _marker(0xC0, sof)
    if include_tables:
        out += _marker(0xC4, _dht_payload(0, 0, DC_LUMA_BITS, DC_LUMA_VALS))
        out += _marker(0xC4, _dht_payload(1, 0, AC_LUMA_BITS, AC_LUMA_VALS))
        if not gray:
            out += _marker(0xC4, _dht_payload(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS))
            out += _marker(0xC4, _dht_payload(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS))
    if ri:
        out += _marker(0xDD, struct.pack(">H", ri))
    sos = bytes([len(planes)])
    for ci in range(len(planes)):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += _marker(0xDA, sos)
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def encode_jpeg_tables(gray: bool = False, quality: int = 85) -> bytes:
    """Abbreviated tables-only stream (SOI, DQT/DHT, EOI) — the payload of
    the TIFF ``JPEGTables`` tag (TIFF Technote 2)."""
    out = bytearray(b"\xff\xd8")
    out += _marker(0xDB, _dqt_payload(0, _quality_scale(QT_LUMA, quality)))
    out += _marker(0xC4, _dht_payload(0, 0, DC_LUMA_BITS, DC_LUMA_VALS))
    out += _marker(0xC4, _dht_payload(1, 0, AC_LUMA_BITS, AC_LUMA_VALS))
    if not gray:
        out += _marker(0xDB, _dqt_payload(1, _quality_scale(QT_CHROMA, quality)))
        out += _marker(0xC4, _dht_payload(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS))
        out += _marker(0xC4, _dht_payload(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS))
    out += b"\xff\xd9"
    return bytes(out)


# ---------------- EXIF (APP1) orientation ----------------


def _exif_tiff(data: bytes) -> bytes | None:
    """The APP1 EXIF payload (a little TIFF stream), or None."""
    if data[:2] != b"\xff\xd8":
        return None
    pos = 2
    n = len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            return None
        marker = data[pos + 1]
        if marker == 0xFF:
            pos += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker in (0xDA, 0xD9):  # scan/EOI: EXIF must precede these
            return None
        (seglen,) = struct.unpack(">H", data[pos + 2:pos + 4])
        if marker == 0xE1 and data[pos + 4:pos + 10] == b"Exif\x00\x00":
            return data[pos + 10:pos + 2 + seglen]
        pos += 2 + seglen
    return None


def exif_orientation(data: bytes) -> int:
    """EXIF orientation (tag 274) from a JPEG's APP1 segment, 1 if absent.

    The EXIF payload is a little TIFF stream (II/MM header + IFD0), so the
    GeoTIFF module's IFD parser reads it as-is (one spec, one parser)."""
    tiff = _exif_tiff(data)
    if tiff is None:
        return 1
    try:
        from ..sources.geotiff import _read_ifd, _tiff_header

        endian, big, off = _tiff_header(tiff)
        tags, _ = _read_ifd(tiff, endian, off, big=big)
        o = tags.get(274, (1,))[0]
        return o if 1 <= o <= 8 else 1
    except (ValueError, struct.error, IndexError):
        return 1


def exif_gps(data: bytes) -> tuple[float, float] | None:
    """(lon, lat) in signed decimal degrees from the EXIF GPS IFD (IFD0
    tag 0x8825 -> GPS tags 1-4: latitude/longitude refs + DMS RATIONAL
    triplets, EXIF 2.x spec), or None when absent/malformed. Decimal =
    d + m/60 + s/3600 in float64 — mirrored exactly by the SQL oracles."""
    tiff = _exif_tiff(data)
    if tiff is None:
        return None
    try:
        from ..sources.geotiff import _read_ifd, _tiff_header

        endian, big, off = _tiff_header(tiff)
        ifd0, _ = _read_ifd(tiff, endian, off, big=big)
        gps_off = ifd0.get(0x8825)
        if not gps_off:
            return None
        gps, _ = _read_ifd(tiff, endian, int(gps_off[0]), big=big)
        lat_ref, lat = gps.get(1), gps.get(2)
        lon_ref, lon = gps.get(3), gps.get(4)
        if not (lat_ref and lon_ref and len(lat or ()) == 3
                and len(lon or ()) == 3):
            return None
        la = lat[0] + lat[1] / 60.0 + lat[2] / 3600.0
        lo = lon[0] + lon[1] / 60.0 + lon[2] / 3600.0
        if lat_ref.startswith("S"):
            la = -la
        if lon_ref.startswith("W"):
            lo = -lo
        return lo, la
    except (ValueError, struct.error, IndexError):
        return None


def exif_gps_app1(
    lat_dms: tuple, lon_dms: tuple, lat_ref: str = "N", lon_ref: str = "E"
) -> bytes:
    """APP1 EXIF segment bytes carrying a GPS IFD. ``lat_dms``/``lon_dms``
    are ((d_num, d_den), (m_num, m_den), (s_num, s_den)) rational triplets
    — exact rationals so fixtures are bit-reproducible."""
    def entry(tag, typ, cnt, value4):
        return struct.pack("<HHI", tag, typ, cnt) + value4

    # layout: header(8) + IFD0(2 + 12 + 4 = 18 @8) + GPSIFD(2+4*12+4=54 @26)
    # + lat rationals(24 @80) + lon rationals(24 @104)
    gps_ifd_off, lat_off, lon_off = 26, 80, 104
    tiff = bytearray()
    tiff += b"II*\x00" + struct.pack("<I", 8)
    tiff += struct.pack("<H", 1)
    tiff += entry(0x8825, 4, 1, struct.pack("<I", gps_ifd_off))
    tiff += struct.pack("<I", 0)
    tiff += struct.pack("<H", 4)
    tiff += entry(1, 2, 2, lat_ref.encode("ascii")[:1] + b"\x00\x00\x00")
    tiff += entry(2, 5, 3, struct.pack("<I", lat_off))
    tiff += entry(3, 2, 2, lon_ref.encode("ascii")[:1] + b"\x00\x00\x00")
    tiff += entry(4, 5, 3, struct.pack("<I", lon_off))
    tiff += struct.pack("<I", 0)
    for num, den in (*lat_dms, *lon_dms):
        tiff += struct.pack("<II", int(num), int(den))
    body = b"Exif\x00\x00" + bytes(tiff)
    return b"\xff\xe1" + struct.pack(">H", len(body) + 2) + body


def insert_app1(jpeg: bytes, app1: bytes) -> bytes:
    """Splice an APP1 segment right after SOI."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    return jpeg[:2] + app1 + jpeg[2:]


def apply_orientation(img: np.ndarray, orientation: int) -> np.ndarray:
    """Apply an EXIF orientation (1..8) to a decoded (h, w[, c]) image —
    the standard mirror/rotate table from the EXIF 2.x spec."""
    if orientation == 2:
        return img[:, ::-1]
    if orientation == 3:
        return img[::-1, ::-1]
    if orientation == 4:
        return img[::-1, :]
    if orientation == 5:
        return np.swapaxes(img, 0, 1)
    if orientation == 6:
        return np.rot90(img, k=-1)
    if orientation == 7:
        return np.swapaxes(img[::-1, ::-1], 0, 1)
    if orientation == 8:
        return np.rot90(img, k=1)
    return img
