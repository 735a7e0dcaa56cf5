"""FLAC codec — from the public format specification, pure numpy/stdlib.

FLAC is the one mainstream compressed audio format whose decode is
FULLY algorithmic — Rice-coded residuals over fixed/LPC predictors,
no psychoacoustics, no empirical Huffman/probability tables — so unlike
MP3/Vorbis/Opus a complete, verifiable decoder is implementable
offline. Decode here is REAL and covers the whole subframe surface:

- stream: fLaC magic, metadata blocks (STREAMINFO parsed; others
  walked), frame headers (all block-size/sample-rate/sample-size
  codes, UTF-8-style coded frame/sample numbers, CRC-8 verified)
- subframes: CONSTANT, VERBATIM, FIXED orders 0-4, LPC orders 1-32
  (quantized-coefficient integer prediction), wasted-bits shift
- residual: 4-bit Rice and 5-bit Rice2 partitions, escape-to-raw
  partitions, zigzag mapping
- stereo decorrelation: independent, left/side, right/side, mid/side
- frame CRC-16 verified

``encode_flac`` is the fixture/round-trip writer covering every decode
path (subframe type per channel chosen constant -> fixed -> verbatim
by exactness/size, optional LPC and mid/side modes, Rice parameter
search with escape, wasted-bits detection). Losslessness means
round-trips are BIT-exact, and the same PCM carried in WAV (the
stdlib-anchored trusted container) and FLAC must decode identically —
that cross-container identity is the validation anchor, as it was for
AIFF/AU. CRC-8/CRC-16 are cross-checked against independent bit-serial
LFSRs in the tests; the coded-number scheme is cross-checked against
CPython's own UTF-8 encoder on the overlapping range.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "decode_flac",
    "encode_flac",
    "flac_info",
    "flac_tags",
    "crc8",
    "crc16",
]


# ---------------- CRCs (FLAC spec: CRC-8 poly 0x07, CRC-16 poly 0x8005,
# both init 0, unreflected) ----------------

_CRC8_T = None
_CRC16_T = None


def crc8(data: bytes) -> int:
    global _CRC8_T
    if _CRC8_T is None:
        t = []
        for i in range(256):
            r = i
            for _ in range(8):
                r = ((r << 1) ^ 0x07) & 0xFF if r & 0x80 else (r << 1) & 0xFF
            t.append(r)
        _CRC8_T = t
    crc = 0
    for b in data:
        crc = _CRC8_T[crc ^ b]
    return crc


def crc16(data: bytes) -> int:
    global _CRC16_T
    if _CRC16_T is None:
        t = []
        for i in range(256):
            r = i << 8
            for _ in range(8):
                r = ((r << 1) ^ 0x8005) & 0xFFFF if r & 0x8000 \
                    else (r << 1) & 0xFFFF
            t.append(r)
        _CRC16_T = t
    crc = 0
    for b in data:
        crc = ((crc << 8) ^ _CRC16_T[((crc >> 8) ^ b) & 0xFF]) & 0xFFFF
    return crc


# ---------------- bit I/O ----------------


class _Bits:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos * 8

    def u(self, n: int) -> int:
        v = 0
        p, d = self.pos, self.data
        if p + n > len(d) * 8:
            raise ValueError("truncated FLAC bitstream")
        for _ in range(n):
            v = (v << 1) | ((d[p >> 3] >> (7 - (p & 7))) & 1)
            p += 1
        self.pos = p
        return v

    def s(self, n: int) -> int:
        v = self.u(n)
        return v - (1 << n) if v & (1 << (n - 1)) else v

    def unary(self) -> int:
        p, d = self.pos, self.data
        n = len(d) * 8
        q = 0
        while p < n and not ((d[p >> 3] >> (7 - (p & 7))) & 1):
            q += 1
            p += 1
        if p >= n:
            raise ValueError("truncated unary code")
        self.pos = p + 1
        return q

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def byte_pos(self) -> int:
        return self.pos >> 3


class _BitsW:
    def __init__(self):
        self.bits: list[int] = []

    def u(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def s(self, v: int, n: int) -> None:
        self.u(v & ((1 << n) - 1), n)

    def unary(self, q: int) -> None:
        self.bits.extend([0] * q)
        self.bits.append(1)

    def align(self) -> None:
        while len(self.bits) % 8:
            self.bits.append(0)

    def bytes(self) -> bytes:
        assert len(self.bits) % 8 == 0
        out = bytearray(len(self.bits) // 8)
        for i, b in enumerate(self.bits):
            if b:
                out[i >> 3] |= 1 << (7 - (i & 7))
        return bytes(out)


# ---------------- coded number (UTF-8-style, up to 36 bits) ----------------


def _read_coded_number(br: _Bits) -> int:
    b0 = br.u(8)
    if b0 < 0x80:
        return b0
    n = 0
    mask = 0x40
    while b0 & mask:
        n += 1
        mask >>= 1
    if n == 0:
        raise ValueError("invalid coded number")
    v = b0 & (mask - 1)
    for _ in range(n):
        c = br.u(8)
        if c & 0xC0 != 0x80:
            raise ValueError("invalid coded number continuation")
        v = (v << 6) | (c & 0x3F)
    return v


def _write_coded_number(bw: _BitsW, v: int) -> None:
    if v < 0x80:
        bw.u(v, 8)
        return
    # count 6-bit groups
    groups = 1
    while v >= (1 << (6 * groups + (6 - groups))):
        groups += 1
    head_bits = 6 - groups
    lead = (0xFF << (head_bits + 1)) & 0xFF
    bw.u(lead | (v >> (6 * groups)), 8)
    for g in range(groups - 1, -1, -1):
        bw.u(0x80 | ((v >> (6 * g)) & 0x3F), 8)


# ---------------- stream / metadata ----------------


def flac_tags(data: bytes) -> dict:
    """VORBIS_COMMENT metadata block (type 4; the Vorbis comment spec:
    little-endian length-prefixed vendor + KEY=value pairs) ->
    {"vendor": str, "tags": {KEY_UPPER: value}}. Empty when absent."""
    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    out = {"vendor": "", "tags": {}}
    while pos + 4 <= len(data):
        hdr = data[pos]
        ln = int.from_bytes(data[pos + 1:pos + 4], "big")
        body = data[pos + 4:pos + 4 + ln]
        if hdr & 0x7F == 4 and len(body) >= 8:
            (vlen,) = struct.unpack("<I", body[0:4])
            out["vendor"] = body[4:4 + vlen].decode("utf-8", "replace")
            p = 4 + vlen
            (cnt,) = struct.unpack("<I", body[p:p + 4])
            p += 4
            for _ in range(cnt):
                (clen,) = struct.unpack("<I", body[p:p + 4])
                p += 4
                kv = body[p:p + clen].decode("utf-8", "replace")
                p += clen
                if "=" in kv:
                    k, v = kv.split("=", 1)
                    out["tags"][k.upper()] = v
        pos += 4 + ln
        if hdr & 0x80:
            break
    return out


def flac_info(data: bytes) -> dict:
    """STREAMINFO probe: {"sample_rate", "channels", "bits",
    "total_samples", "min_block", "max_block", "md5"}."""
    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    out = None
    while pos + 4 <= len(data):
        hdr = data[pos]
        last = hdr & 0x80
        btype = hdr & 0x7F
        ln = int.from_bytes(data[pos + 1:pos + 4], "big")
        body = data[pos + 4:pos + 4 + ln]
        if btype == 0:
            mnb, mxb = struct.unpack(">HH", body[0:4])
            packed = int.from_bytes(body[10:18], "big")
            out = {
                "min_block": mnb,
                "max_block": mxb,
                "sample_rate": packed >> 44,
                "channels": ((packed >> 41) & 7) + 1,
                "bits": ((packed >> 36) & 0x1F) + 1,
                "total_samples": packed & ((1 << 36) - 1),
                "md5": body[18:34],
                "frames_at": pos + 4 + ln if last else None,
            }
        pos += 4 + ln
        if last:
            if out is not None:
                out["frames_at"] = pos
            break
    if out is None:
        raise ValueError("no STREAMINFO block")
    return out


_BLOCKSIZE_CODES = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                    13: 8192, 14: 16384, 15: 32768}
_RATE_CODES = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000,
               6: 22050, 7: 24000, 8: 32000, 9: 44100, 10: 48000,
               11: 96000}
_BPS_CODES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}

# fixed predictor coefficients by order (spec §fixed predictors)
_FIXED = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _read_residual(br: _Bits, blocksize: int, order: int) -> np.ndarray:
    method = br.u(2)
    if method > 1:
        raise ValueError("reserved residual coding method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = br.u(4)
    nparts = 1 << porder
    if blocksize % nparts:
        raise ValueError("invalid partition order")
    out = np.empty(blocksize - order, np.int64)
    k = 0
    for part in range(nparts):
        n = blocksize // nparts - (order if part == 0 else 0)
        param = br.u(pbits)
        if param == escape:
            raw = br.u(5)
            for i in range(n):
                out[k + i] = br.s(raw) if raw else 0
        else:
            for i in range(n):
                q = br.unary()
                v = (q << param) | br.u(param) if param else q
                out[k + i] = (v >> 1) ^ -(v & 1)
        k += n
    return out


def _write_residual(bw: _BitsW, res: np.ndarray, blocksize: int,
                    order: int, porder: int = 0, rice2: bool = False) -> None:
    """Rice residual with per-partition parameter search + escape;
    ``porder`` > 0 splits into 2^porder partitions and ``rice2`` uses
    the 5-bit method so both decode paths have encoder coverage."""
    pbits = 5 if rice2 else 4
    escape = (1 << pbits) - 1
    nparts = 1 << porder
    assert blocksize % nparts == 0
    bw.u(1 if rice2 else 0, 2)
    bw.u(porder, 4)
    k = 0
    for part in range(nparts):
        n = blocksize // nparts - (order if part == 0 else 0)
        chunk = res[k:k + n]
        k += n
        zz = (np.abs(chunk) * 2 - (chunk < 0)).astype(np.int64)
        best_p, best_cost = 0, None
        for p in range(escape):
            cost = int((zz >> p).sum()) + len(zz) * (p + 1)
            if best_cost is None or cost < best_cost:
                best_p, best_cost = p, cost
        raw_bits = (int(np.abs(chunk).max()).bit_length() + 1
                    if len(chunk) and np.any(chunk) else 1)
        if best_cost > len(chunk) * raw_bits + 5:
            bw.u(escape, pbits)
            bw.u(raw_bits, 5)
            for v in chunk:
                bw.s(int(v), raw_bits)
            continue
        bw.u(best_p, pbits)
        for v in zz:
            q = int(v) >> best_p
            bw.unary(q)
            if best_p:
                bw.u(int(v) & ((1 << best_p) - 1), best_p)


def _decode_subframe(br: _Bits, blocksize: int, bps: int) -> np.ndarray:
    if br.u(1):
        raise ValueError("subframe padding bit set")
    t = br.u(6)
    wasted = 0
    if br.u(1):
        wasted = br.unary() + 1
    eff = bps - wasted
    if t == 0:  # CONSTANT
        v = br.s(eff)
        out = np.full(blocksize, v, np.int64)
    elif t == 1:  # VERBATIM
        out = np.array([br.s(eff) for _ in range(blocksize)], np.int64)
    elif 8 <= t <= 12:  # FIXED order t-8
        order = t - 8
        warm = [br.s(eff) for _ in range(order)]
        res = _read_residual(br, blocksize, order)
        out = np.empty(blocksize, np.int64)
        out[:order] = warm
        coefs = _FIXED[order]
        for i in range(order, blocksize):
            acc = res[i - order]
            for j, c in enumerate(coefs):
                acc += c * out[i - 1 - j]
            out[i] = acc
    elif t >= 32:  # LPC order t-31
        order = t - 31
        warm = [br.s(eff) for _ in range(order)]
        prec = br.u(4) + 1
        if prec == 16:
            raise ValueError("invalid qlp precision")
        shift = br.s(5)
        coefs = [br.s(prec) for _ in range(order)]
        res = _read_residual(br, blocksize, order)
        out = np.empty(blocksize, np.int64)
        out[:order] = warm
        for i in range(order, blocksize):
            acc = 0
            for j in range(order):
                acc += coefs[j] * out[i - 1 - j]
            out[i] = (acc >> shift) + res[i - order]
    else:
        raise ValueError(f"reserved subframe type {t}")
    return out << wasted if wasted else out


def decode_flac(data: bytes) -> tuple[np.ndarray, int, int]:
    """FLAC bytes -> (int32 samples shaped (n, channels), sample_rate,
    bits_per_sample). Bit-exact lossless decode; CRC-8/16 verified."""
    si = flac_info(data)
    pos = si["frames_at"]
    chans = []
    rate = si["sample_rate"]
    bits = si["bits"]
    n_total = si["total_samples"]
    got = 0
    while pos < len(data) - 2 and (not n_total or got < n_total):
        hdr_start = pos
        br = _Bits(data, pos)
        sync = br.u(14)
        if sync != 0x3FFE:
            raise ValueError("lost frame sync")
        br.u(1)  # reserved
        br.u(1)  # blocking strategy
        bs_code = br.u(4)
        sr_code = br.u(4)
        ch_code = br.u(4)
        bps_code = br.u(3)
        br.u(1)  # reserved
        _read_coded_number(br)
        if bs_code == 6:
            blocksize = br.u(8) + 1
        elif bs_code == 7:
            blocksize = br.u(16) + 1
        elif bs_code == 0:
            raise ValueError("reserved block size code")
        else:
            blocksize = _BLOCKSIZE_CODES[bs_code]
        if sr_code == 12:
            rate = br.u(8) * 1000
        elif sr_code == 13:
            rate = br.u(16)
        elif sr_code == 14:
            rate = br.u(16) * 10
        elif sr_code == 15:
            raise ValueError("invalid sample rate code")
        elif sr_code:
            rate = _RATE_CODES[sr_code]
        bps = bits if bps_code == 0 else _BPS_CODES[bps_code]
        hdr_crc = br.u(8)
        if crc8(data[hdr_start:br.byte_pos() - 1]) != hdr_crc:
            raise ValueError("frame header CRC-8 mismatch")
        if ch_code < 8:
            nch = ch_code + 1
            subs = [_decode_subframe(br, blocksize, bps)
                    for _ in range(nch)]
        elif ch_code in (8, 9, 10):
            nch = 2
            bps_a = bps + (1 if ch_code == 9 else 0)
            bps_b = bps + (1 if ch_code in (8, 10) else 0)
            a = _decode_subframe(br, blocksize, bps_a)
            b = _decode_subframe(br, blocksize, bps_b)
            if ch_code == 8:     # left/side
                subs = [a, a - b]
            elif ch_code == 9:   # side/right
                subs = [a + b, b]
            else:                # mid/side
                side = b
                mid2 = (a << 1) | (side & 1)
                subs = [(mid2 + side) >> 1, (mid2 - side) >> 1]
        else:
            raise ValueError("reserved channel assignment")
        br.align()
        fcrc = br.u(16)
        if crc16(data[hdr_start:br.byte_pos() - 2]) != fcrc:
            raise ValueError("frame CRC-16 mismatch")
        chans.append(np.stack(subs, axis=1))
        got += blocksize
        pos = br.byte_pos()
    samples = np.concatenate(chans, axis=0) if chans else \
        np.zeros((0, si["channels"]), np.int64)
    if n_total:
        samples = samples[:n_total]
    return samples.astype(np.int32), rate, bits


# ---------------- encoder (fixture / round-trip writer) ----------------


def _encode_subframe(bw: _BitsW, s: np.ndarray, bps: int,
                     lpc: tuple[list[int], int] | None,
                     porder: int = 0, rice2: bool = False) -> None:
    s = s.astype(np.int64)
    # wasted bits: common low zero bits
    wasted = 0
    if np.any(s):
        ors = int(np.bitwise_or.reduce(s))
        while not (ors >> wasted) & 1:
            wasted += 1
    else:
        wasted = 0
    eff = bps - wasted
    sw = s >> wasted if wasted else s

    def _wasted_bits():
        if wasted:
            bw.u(1, 1)
            bw.unary(wasted - 1)
        else:
            bw.u(0, 1)

    if np.all(sw == sw[0]):
        bw.u(0, 1)
        bw.u(0, 6)
        _wasted_bits()
        bw.s(int(sw[0]), eff)
        return
    if lpc is not None and len(sw) > len(lpc[0]):
        coefs, shift = lpc
        order = len(coefs)
        prec = max(max(abs(c) for c in coefs).bit_length() + 1, 2)
        bw.u(0, 1)
        bw.u(32 + order - 1, 6)
        _wasted_bits()
        for v in sw[:order]:
            bw.s(int(v), eff)
        bw.u(prec - 1, 4)
        bw.s(shift, 5)
        for c in coefs:
            bw.s(c, prec)
        pred = np.zeros(len(sw) - order, np.int64)
        for j in range(order):
            pred += coefs[j] * sw[order - 1 - j:len(sw) - 1 - j]
        res = sw[order:] - (pred >> shift)
        _write_residual(bw, res, len(sw), order, porder, rice2)
        return
    # fixed order 2 when it helps, else verbatim
    if len(sw) > 2:
        res2 = sw[2:] - 2 * sw[1:-1] + sw[:-2]
        if int(np.abs(res2).mean()) < int(np.abs(sw).mean()) + 1:
            bw.u(0, 1)
            bw.u(8 + 2, 6)
            _wasted_bits()
            bw.s(int(sw[0]), eff)
            bw.s(int(sw[1]), eff)
            _write_residual(bw, res2, len(sw), 2, porder, rice2)
            return
    bw.u(0, 1)
    bw.u(1, 6)  # VERBATIM
    _wasted_bits()
    for v in sw:
        bw.s(int(v), eff)


def encode_flac(
    samples: np.ndarray,
    sample_rate: int = 44100,
    bits: int = 16,
    block_size: int = 4096,
    mid_side: bool = False,
    lpc: tuple[list[int], int] | None = None,
    partition_order: int = 0,
    rice2: bool = False,
    tags: dict | None = None,
) -> bytes:
    """int PCM (n,) or (n, channels) -> FLAC bytes (lossless; the
    round-trip through decode_flac is bit-exact).

    ``mid_side=True`` uses mid/side decorrelation for stereo input;
    ``lpc=(coefs, shift)`` forces quantized-LPC subframes so the LPC
    decode path has real fixtures."""
    s = np.asarray(samples, np.int64)
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    if ch > 8:
        raise ValueError("at most 8 channels")
    lim = 1 << (bits - 1)
    if s.min() < -lim or s.max() >= lim:
        raise ValueError(f"samples exceed {bits}-bit range")

    frames = b""
    frame_no = 0
    for start in range(0, max(n, 1), block_size):
        blk = s[start:start + block_size]
        if len(blk) == 0:
            break
        bw = _BitsW()
        bw.u(0x3FFE, 14)
        bw.u(0, 1)
        bw.u(0, 1)          # fixed blocking strategy
        bw.u(7, 4)          # block size as 16-bit value at end
        bw.u(0, 4)          # rate from STREAMINFO
        use_ms = mid_side and ch == 2
        bw.u(10 if use_ms else ch - 1, 4)
        bps_code = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}.get(bits, 0)
        bw.u(bps_code, 3)
        bw.u(0, 1)
        _write_coded_number(bw, frame_no)
        bw.u(len(blk) - 1, 16)
        hdr = bw.bytes()
        hdr += bytes([crc8(hdr)])
        fb = _BitsW()
        po = partition_order if len(blk) % (1 << partition_order) == 0 \
            else 0
        if use_ms:
            left = blk[:, 0]
            right = blk[:, 1]
            mid = (left + right) >> 1
            side = left - right
            _encode_subframe(fb, mid, bits, lpc, po, rice2)
            _encode_subframe(fb, side, bits + 1, lpc, po, rice2)
        else:
            for c in range(ch):
                _encode_subframe(fb, blk[:, c], bits, lpc, po, rice2)
        fb.align()
        frame = hdr + fb.bytes()
        frame += struct.pack(">H", crc16(frame))
        frames += frame
        frame_no += 1

    mnb = mxb = min(block_size, n) if n else block_size
    if n > block_size:
        mnb = n % block_size or block_size
        mnb, mxb = min(mnb, block_size), block_size
    packed = (sample_rate << 44) | ((ch - 1) << 41) | ((bits - 1) << 36) | n
    streaminfo = (
        struct.pack(">HH", mnb, mxb)
        + b"\x00" * 6  # min/max frame size unknown
        + packed.to_bytes(8, "big")
        + b"\x00" * 16  # md5 unset
    )
    if tags:
        body = struct.pack("<I", 0) + struct.pack("<I", len(tags))
        for k, v in tags.items():
            kv = f"{k}={v}".encode("utf-8")
            body += struct.pack("<I", len(kv)) + kv
        meta = (bytes([0x00]) + len(streaminfo).to_bytes(3, "big")
                + streaminfo
                + bytes([0x84]) + len(body).to_bytes(3, "big") + body)
    else:
        meta = bytes([0x80]) + len(streaminfo).to_bytes(3, "big") + streaminfo
    return b"fLaC" + meta + frames
