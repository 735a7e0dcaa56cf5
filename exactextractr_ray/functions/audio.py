"""AIFF/AIFF-C and Sun AU audio decoders + G.711 companding, pure
numpy/struct.

Both containers are simple public formats (AIFF: Apple EA-IFF-85, 1989;
AU: Sun ".snd" header), and G.711 mu-law/A-law expansion is fully
specified in the ITU-T G.711 tables, so the audio-feature stage
(stages/multimodal.py) gets three real container formats with no native
libraries. Everything returns the engine's waveform contract: (float32
mono in [-1, 1], sample_rate) — multi-channel averaged to mono, matching
codecs.decode_wav.

Validated cross-format in tests: CPython's own test fixtures ship the
SAME recording as pluck-pcm16.{wav,aiff,au} (and 8/24/32-bit + ulaw/alaw
variants), so WAV (already trusted) anchors AIFF/AU/G.711 bit-for-bit.
"""

from __future__ import annotations

import struct

import numpy as np


def _mono(pcm: np.ndarray, ch: int, scale: float) -> np.ndarray:
    return pcm.reshape(-1, ch).astype(np.float32).mean(axis=1) / scale


def _pcm_be(data: bytes, bits: int, n: int) -> np.ndarray:
    """Big-endian signed PCM samples -> int32 array (natural scale)."""
    if bits == 8:
        return np.frombuffer(data, np.int8, count=n).astype(np.int32)
    if bits == 16:
        return np.frombuffer(data, ">i2", count=n).astype(np.int32)
    if bits == 32:
        return np.frombuffer(data, ">i4", count=n).astype(np.int32)
    if bits == 24:
        b = np.frombuffer(data, np.uint8, count=3 * n).reshape(n, 3)
        v = (
            (b[:, 0].astype(np.int32) << 16)
            | (b[:, 1].astype(np.int32) << 8)
            | b[:, 2].astype(np.int32)
        )
        return v - ((v & 0x800000) << 1)  # sign-extend
    raise NotImplementedError(f"{bits}-bit PCM unsupported")


_PCM_SCALE = {8: 128.0, 16: 32768.0, 24: 8388608.0, 32: 2147483648.0}


def _g711_ulaw_table() -> np.ndarray:
    """ITU-T G.711 mu-law expansion, all 256 codes -> int16 linear."""
    u = np.arange(256, dtype=np.int32) ^ 0xFF
    sign = (u & 0x80) != 0
    exp = (u >> 4) & 7
    mant = u & 0x0F
    mag = (((mant << 3) + 0x84) << exp) - 0x84
    return np.where(sign, -mag, mag).astype(np.int16)


def _g711_alaw_table() -> np.ndarray:
    """ITU-T G.711 A-law expansion, all 256 codes -> int16 linear."""
    a = np.arange(256, dtype=np.int32) ^ 0x55
    sign = (a & 0x80) != 0  # A-law: set sign bit means POSITIVE (G.711)
    exp = (a >> 4) & 7
    mant = a & 0x0F
    mag = np.where(
        exp == 0, (mant << 4) + 8, ((mant << 4) + 0x108) << np.maximum(exp - 1, 0)
    )
    return np.where(sign, mag, -mag).astype(np.int16)


_ULAW = _g711_ulaw_table()
_ALAW = _g711_alaw_table()


def _float80(b: bytes) -> float:
    """80-bit IEEE extended float (the AIFF sample-rate field)."""
    (se,) = struct.unpack(">H", b[:2])
    (mant,) = struct.unpack(">Q", b[2:10])
    sign = -1.0 if se & 0x8000 else 1.0
    exp = se & 0x7FFF
    if exp == 0 and mant == 0:
        return 0.0
    return sign * mant * 2.0 ** (exp - 16383 - 63)


def decode_aiff(data: bytes) -> tuple[np.ndarray, int]:
    """AIFF / AIFF-C bytes -> (float32 mono waveform in [-1, 1], rate).

    PCM 8/16/24/32 ('NONE'/'sowt' raises for the little-endian variant),
    plus AIFC G.711 'ulaw'/'ULAW'/'alaw'/'ALAW' compression."""
    if data[:4] != b"FORM" or data[8:12] not in (b"AIFF", b"AIFC"):
        raise ValueError("not an AIFF: missing FORM/AIFF header")
    is_aifc = data[8:12] == b"AIFC"
    pos = 12
    ch = bits = None
    rate = 0
    comp = b"NONE"
    ssnd = None
    nframes = 0
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        (size,) = struct.unpack(">I", data[pos + 4:pos + 8])
        body = data[pos + 8:pos + 8 + size]
        pos += 8 + size + (size & 1)  # chunks are word-aligned
        if cid == b"COMM":
            ch, nframes, bits = struct.unpack(">hIh", body[:8])
            rate = int(round(_float80(body[8:18])))
            if is_aifc and len(body) >= 22:
                comp = body[18:22]
        elif cid == b"SSND":
            off, _block = struct.unpack(">II", body[:8])
            ssnd = body[8 + off:]
    if ch is None or ssnd is None:
        raise ValueError("AIFF missing COMM/SSND chunk")
    n = nframes * ch
    if comp in (b"NONE", b"none"):
        pcm = _pcm_be(ssnd, bits, n)
        return _mono(pcm, ch, _PCM_SCALE[bits]), rate
    if comp.lower() == b"ulaw":
        pcm = _ULAW[np.frombuffer(ssnd, np.uint8, count=n)]
        return _mono(pcm, ch, 32768.0), rate
    if comp.lower() == b"alaw":
        pcm = _ALAW[np.frombuffer(ssnd, np.uint8, count=n)]
        return _mono(pcm, ch, 32768.0), rate
    raise NotImplementedError(f"AIFC compression {comp!r} unsupported")


# Sun AU encodings (public .snd header spec)
_AU_ENC = {1: "ulaw", 2: 8, 3: 16, 4: 24, 5: 32, 27: "alaw"}


def decode_au(data: bytes) -> tuple[np.ndarray, int]:
    """Sun/NeXT AU bytes -> (float32 mono waveform in [-1, 1], rate)."""
    if data[:4] != b".snd":
        raise ValueError("not an AU file: missing .snd magic")
    off, size, enc, rate, ch = struct.unpack(">5I", data[4:24])
    body = data[off:off + size] if size != 0xFFFFFFFF else data[off:]
    kind = _AU_ENC.get(enc)
    if kind is None:
        raise NotImplementedError(f"AU encoding {enc} unsupported")
    if kind == "ulaw":
        pcm = _ULAW[np.frombuffer(body, np.uint8)]
        return _mono(pcm, ch, 32768.0), rate
    if kind == "alaw":
        pcm = _ALAW[np.frombuffer(body, np.uint8)]
        return _mono(pcm, ch, 32768.0), rate
    bits = kind
    n = (len(body) * 8 // bits) // ch * ch
    pcm = _pcm_be(body, bits, n)
    return _mono(pcm, ch, _PCM_SCALE[bits]), rate
