"""Lossy WebP (VP8) decode/encode via the SYSTEM libwebp, ctypes-gated.

The pure-Python codecs in this repo are from-scratch where the public
bitstream spec alone suffices (PNG, JPEG, GIF, VP8L, ...). VP8 keyframe
decode additionally requires ~2000 exact default-probability constants
(RFC 6386 §13.5 coefficient probs, kf b-mode probs) that cannot be
reconstructed from the spec's prose; rather than ship a fake, this module
binds the system ``libwebp.so`` (present on most Linux hosts, no pip
install) behind an availability gate:

* :func:`available` — True when the library loaded;
* :func:`decode_rgba` — full WebP file bytes -> (h, w, 4) uint8 RGBA,
  handling VP8 (lossy), VP8L and VP8X/ALPH containers alike;
* :func:`encode_rgb` / :func:`encode_lossless_rgb` — fixture generators
  for tests and an independent golden for the pure-Python VP8L decoder.

Nothing imports this module at package import time; consumers call
``available()`` and fall back to the documented NotImplementedError /
DeterministicFakeDecoder path when the library is absent (the
environment contract: stub or gate anything not baked in).
"""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    names = ["libwebp.so.7", "libwebp.so", "libwebp.7.dylib", "libwebp.dylib"]
    found = ctypes.util.find_library("webp")
    if found:
        names.insert(0, found)
    for n in names:
        try:
            lib = ctypes.CDLL(n)
        except OSError:
            continue
        try:
            lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
            lib.WebPDecodeRGBA.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ]
            lib.WebPGetInfo.restype = ctypes.c_int
            lib.WebPGetInfo.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ]
            lib.WebPEncodeRGB.restype = ctypes.c_size_t
            lib.WebPEncodeRGB.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_float,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ]
            lib.WebPEncodeLosslessRGB.restype = ctypes.c_size_t
            lib.WebPEncodeLosslessRGB.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ]
            lib.WebPFree.restype = None
            lib.WebPFree.argtypes = [ctypes.c_void_p]
        except AttributeError:
            continue
        _LIB = lib
        break
    return _LIB


def available() -> bool:
    return _load() is not None


def decode_rgba(data: bytes) -> np.ndarray:
    """Full WebP file bytes -> (h, w, 4) uint8 RGBA via libwebp (lossy
    VP8, lossless VP8L, and VP8X/ALPH containers)."""
    lib = _load()
    if lib is None:
        raise NotImplementedError("libwebp not available on this host")
    w = ctypes.c_int(0)
    h = ctypes.c_int(0)
    buf = lib.WebPDecodeRGBA(data, len(data), ctypes.byref(w),
                             ctypes.byref(h))
    if not buf:
        raise ValueError("libwebp: decode failed (corrupt WebP payload)")
    try:
        n = w.value * h.value * 4
        out = np.ctypeslib.as_array(buf, shape=(n,)).copy()
    finally:
        lib.WebPFree(ctypes.cast(buf, ctypes.c_void_p))
    return out.reshape(h.value, w.value, 4)


def _encode(fn, img: np.ndarray, *extra) -> bytes:
    a = np.ascontiguousarray(img, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError("encoder expects (h, w, 3) uint8 RGB")
    h, w = a.shape[:2]
    out = ctypes.POINTER(ctypes.c_uint8)()
    size = fn(a.tobytes(), w, h, w * 3, *extra, ctypes.byref(out))
    if size == 0 or not out:
        raise ValueError("libwebp: encode failed")
    try:
        data = ctypes.string_at(out, size)
    finally:
        _LIB.WebPFree(ctypes.cast(out, ctypes.c_void_p))
    return data


def encode_rgb(img: np.ndarray, quality: float = 90.0) -> bytes:
    """(h, w, 3) uint8 RGB -> lossy VP8 WebP bytes."""
    lib = _load()
    if lib is None:
        raise NotImplementedError("libwebp not available on this host")
    return _encode(lib.WebPEncodeRGB, img, ctypes.c_float(quality))


def encode_lossless_rgb(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> lossless VP8L WebP bytes (independent
    golden source for the pure-Python VP8L decoder)."""
    lib = _load()
    if lib is None:
        raise NotImplementedError("libwebp not available on this host")
    return _encode(lib.WebPEncodeLosslessRGB, img)
