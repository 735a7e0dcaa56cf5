"""WebP lossless (VP8L) codec: encoder/decoder round trips over every
transform and entropy feature, libwebp-encoded embedded goldens (the
code-length-order regression), real-file alpha-plane decode, native
libwebp cross-validation when the shared library is present, and the
actor-pool decode stage end-to-end."""

from __future__ import annotations

import ctypes.util
import os

import numpy as np
import pytest

from exactextractr_ray.functions.codecs import probe_media, sniff_media
from exactextractr_ray.functions.webp import (
    decode_webp,
    decode_webp_alpha,
    encode_webp_lossless,
    webp_info,
)


def _to_rgba(x: np.ndarray) -> np.ndarray:
    if x.ndim == 2:
        x = np.stack([x] * 3, -1)
    if x.shape[2] == 3:
        x = np.dstack([x, np.full(x.shape[:2], 255, np.uint8)])
    return x


def _roundtrip(img, **opts):
    out = decode_webp(encode_webp_lossless(img, **opts))
    assert np.array_equal(_to_rgba(np.asarray(img)), _to_rgba(out))


def test_roundtrip_basic_shapes():
    rng = np.random.RandomState(7)
    _roundtrip(rng.randint(0, 256, (13, 17)).astype(np.uint8))
    _roundtrip(rng.randint(0, 256, (9, 21, 3)).astype(np.uint8))
    _roundtrip(rng.randint(0, 256, (8, 8, 4)).astype(np.uint8))
    _roundtrip(rng.randint(0, 256, (1, 1, 3)).astype(np.uint8))
    _roundtrip(rng.randint(0, 256, (1, 40)).astype(np.uint8))
    _roundtrip(rng.randint(0, 256, (40, 1)).astype(np.uint8))


def test_roundtrip_all_predictor_modes():
    rng = np.random.RandomState(8)
    img = rng.randint(0, 256, (11, 19, 3)).astype(np.uint8)
    for mode in range(14):
        _roundtrip(img, predictor=mode)


def test_roundtrip_transform_combos():
    rng = np.random.RandomState(9)
    img = rng.randint(0, 256, (10, 14, 3)).astype(np.uint8)
    _roundtrip(img, subtract_green=True)
    _roundtrip(img, color_transform=(37, 200, 5))
    _roundtrip(img, subtract_green=True, color_transform=(250, 3, 128),
               predictor=11)
    _roundtrip(img, subtract_green=True, predictor=13, cache_bits=5)


def test_roundtrip_palette_bundling():
    """All four index-bundling depths (8/4/2/1 indices per byte)."""
    rng = np.random.RandomState(10)
    vals = np.unique(rng.randint(0, 256, (400,)).astype(np.uint8))
    for n_colors in (2, 3, 4, 9, 16, 17, 60, 200):
        img = vals[:n_colors][rng.randint(0, n_colors, (9, 14))]
        _roundtrip(img, palette=True)


def test_roundtrip_lz77_and_cache():
    rng = np.random.RandomState(11)
    runs = np.repeat(rng.randint(0, 256, (7, 12)).astype(np.uint8), 5, axis=1)
    _roundtrip(runs, use_lz77=True)
    rows = np.tile(rng.randint(0, 256, (1, 33)).astype(np.uint8), (20, 1))
    _roundtrip(rows, use_lz77=True)
    few = (rng.randint(0, 6, (18, 18)) * 40).astype(np.uint8)
    for bits in (1, 4, 11):
        _roundtrip(few, cache_bits=bits)
    _roundtrip(few, cache_bits=3, use_lz77=True)


# --- embedded libwebp goldens: real encoder output, rule-derived pixels ---

_GOLDEN_SMOOTH = (  # 32x32 gradient; predictor + cross-color transforms
    b"RIFF>\x00\x00\x00WEBPVP8L2\x00\x00\x00/\x1f\xc0\x07\x00\t\x80H\xda"
    b"\x1f|\x85\x88\xfe\xa7.\x00\x82\xf0?n!\n\xd1\xffT(m\xdb\x80\xe9\xfc"
    b"\xff\xee\xe2\x12\x85\x00\x02\xa0\xa0\x99\x83\x98\x00\xa0X\xf3\xf7\x06"
)

_GOLDEN_PALETTE = (  # 20x19 five-color rule image; color-indexing transform
    b"RIFFh\x00\x00\x00WEBPVP8L[\x00\x00\x00/\x12\xc0\x04\x00'\xa0\x98\x8d"
    b"\x048\x06\xb0\x1a\xfb^\x89S1\x1b\tp\x0c`5\xf6\xbd\x12\xa7b6\x12\xe0"
    b"\x18\xc0j\xec{%\xce\xf9\x0f\x00I\x92\xc4\xb6\xff\xa0\x18\x92$\xe6\x92"
    b"\xc1*,\xc0)\x9c?Vz\xde;\xa2\xffj\xd36`&;\xe5\x92,\x03\xfb\x17\x06\xce"
    b"B\xb9\xe1\xb5!8\xf0\xd4\xc5\x00\x00"
)


def test_golden_libwebp_smooth():
    """Real libwebp output (predictor + cross-color + normal codes with
    repeat-16 tokens): regression for the code-length transmission order
    (16 comes after 5) that round trips alone cannot catch."""
    yy, xx = np.meshgrid(np.arange(32), np.arange(32), indexing="ij")
    expect = np.stack(
        [(yy * 3 + xx * 2) % 256, (yy + xx * 5) % 256, (yy * 7) % 256],
        -1,
    ).astype(np.uint8)
    info = webp_info(_GOLDEN_SMOOTH)
    assert (info["width"], info["height"]) == (32, 32)
    out = decode_webp(_GOLDEN_SMOOTH)
    assert np.array_equal(_to_rgba(out), _to_rgba(expect))


def test_golden_libwebp_palette():
    yy, xx = np.meshgrid(np.arange(20), np.arange(19), indexing="ij")
    vals = np.array([11, 47, 93, 160, 231], np.uint8)
    expect = vals[(yy * 7 + xx * 3) % 5]
    out = decode_webp(_GOLDEN_PALETTE)
    assert np.array_equal(_to_rgba(out), _to_rgba(expect))


# --- real-web lossy file: ALPH plane through the lossless entropy layer ---

_PY_WEBP = (
    "/root/.pyenv/versions/3.13.0/lib/python3.13/test/test_email/data/"
    "python.webp"
)

# libwebp's own WebPDecodeRGBA alpha channel for python.webp (row-major)
_PY_WEBP_ALPHA_TRUTH = bytes.fromhex(
    "00000000afedfffffff7920b0300000000000000ffffffffffffff280b000000"
    "00000000ffffffffffffff4115000000007ea0a1a3a7aaaaffffff4818000000"
    "bdffffffffffffffffffff48fff7820affffffffffffffffffffb643ffffed24"
    "fffffffffffffffff7b64f88ffffff3dffffffffb65c4c4847416bf7ffffff46"
    "f7ffffaa4ea6f7fffffffffffffff747d7ffff5bb3ffffffffffffffffffc241"
    "6ff7ff4bffffffffffffffffffff7a3408213c35ffffffaaa9a9a9a9a9794120"
    "02091312ffffffffffffff41352c1e0b00000000f7fffffffffff7401c090501"
    "000000004cccf7ffffd87b3b1200000000000000081d35424745381f08000000"
)


def _py_webp_alpha_truth():
    return np.frombuffer(_PY_WEBP_ALPHA_TRUTH, np.uint8).reshape(16, 16)


@pytest.mark.skipif(not os.path.exists(_PY_WEBP), reason="host file absent")
def test_real_file_alpha_plane():
    data = open(_PY_WEBP, "rb").read()
    info = webp_info(data)
    assert info == {"format": "extended", "width": 16, "height": 16,
                    "has_alpha": True}
    alpha = decode_webp_alpha(data)
    assert alpha.shape == (16, 16)
    assert np.array_equal(alpha, _py_webp_alpha_truth())
    # lossy VP8 decodes through the native gate when libwebp is present
    # (round 5); without it the documented NotImplementedError remains
    from exactextractr_ray.functions import vp8_native

    if vp8_native.available():
        img = decode_webp(data)
        assert img.shape == (16, 16, 4)
        # the container ALPH plane and the native RGBA alpha must agree
        assert np.array_equal(img[..., 3], _py_webp_alpha_truth())
    else:
        with pytest.raises(NotImplementedError):
            decode_webp(data)


# --- native libwebp cross-validation (skipped where the lib is absent) ---

_LIBWEBP = ctypes.util.find_library("webp") or (
    "/usr/lib/x86_64-linux-gnu/libwebp.so.7"
    if os.path.exists("/usr/lib/x86_64-linux-gnu/libwebp.so.7")
    else None
)


def _libwebp():
    import ctypes as ct

    lib = ct.CDLL(_LIBWEBP)
    lib.WebPDecodeRGBA.restype = ct.POINTER(ct.c_uint8)
    lib.WebPEncodeLosslessRGBA.restype = ct.c_size_t
    lib.WebPFree.argtypes = [ct.c_void_p]
    return lib


@pytest.mark.skipif(_LIBWEBP is None, reason="libwebp not on this host")
def test_encoder_accepted_by_libwebp():
    import ctypes as ct

    lib = _libwebp()
    rng = np.random.RandomState(21)
    img = rng.randint(0, 256, (12, 15, 4)).astype(np.uint8)
    for opts in ({}, dict(subtract_green=True, predictor=12),
                 dict(cache_bits=4, use_lz77=True)):
        enc = encode_webp_lossless(img, **opts)
        w = ct.c_int()
        h = ct.c_int()
        ptr = lib.WebPDecodeRGBA(enc, len(enc), ct.byref(w), ct.byref(h))
        assert ptr, "libwebp rejected our stream"
        got = np.ctypeslib.as_array(ptr, shape=(h.value, w.value, 4)).copy()
        lib.WebPFree(ptr)
        assert np.array_equal(got, img)


@pytest.mark.skipif(_LIBWEBP is None, reason="libwebp not on this host")
def test_decoder_matches_libwebp_fuzz():
    """libwebp-encoded structured images (its encoder picks transforms,
    color cache, meta prefix groups and max_symbol freely) must decode
    bit-exact to libwebp's own decode."""
    import ctypes as ct

    lib = _libwebp()
    rng = np.random.RandomState(22)
    for trial in range(8):
        hh, ww = (int(v) for v in rng.randint(20, 140, 2))
        kind = trial % 4
        if kind == 0:
            img = rng.randint(0, 256, (hh, ww, 4)).astype(np.uint8)
        elif kind == 1:
            pal = rng.randint(0, 256, (9, 4)).astype(np.uint8)
            img = pal[rng.randint(0, 9, (hh, ww))]
        elif kind == 2:
            yy, xx = np.meshgrid(np.arange(hh), np.arange(ww), indexing="ij")
            img = np.stack([(yy * 2 + xx) % 256, (yy + xx * 3) % 256,
                            (xx * 5) % 256, np.full((hh, ww), 255)],
                           -1).astype(np.uint8)
        else:
            img = np.zeros((hh, ww, 4), np.uint8)
            img[: hh // 2] = rng.randint(0, 256, (hh // 2, ww, 4))
            img[hh // 2:] = 200
        img = np.ascontiguousarray(img)
        out = ct.POINTER(ct.c_uint8)()
        n = lib.WebPEncodeLosslessRGBA(
            img.ctypes.data_as(ct.POINTER(ct.c_uint8)), ww, hh, ww * 4,
            ct.byref(out),
        )
        enc = bytes(bytearray(out[i] for i in range(n)))
        lib.WebPFree(out)
        w = ct.c_int()
        h = ct.c_int()
        ptr = lib.WebPDecodeRGBA(enc, len(enc), ct.byref(w), ct.byref(h))
        truth = np.ctypeslib.as_array(ptr, shape=(h.value, w.value, 4)).copy()
        lib.WebPFree(ptr)
        got = _to_rgba(decode_webp(enc))
        assert np.array_equal(got, truth), f"trial {trial} kind {kind}"


# --- error guards + container probe + decode stage ---

def test_error_guards():
    with pytest.raises(ValueError):
        decode_webp(b"RIFF\x00\x00\x00\x00NOPE")
    good = encode_webp_lossless(np.zeros((4, 4), np.uint8))
    with pytest.raises(ValueError):
        decode_webp(good[:-6] + b"\x00" * 2)  # truncated payload
    bad_sig = bytearray(good)
    bad_sig[20] ^= 0xFF  # VP8L signature byte
    with pytest.raises(ValueError):
        decode_webp(bytes(bad_sig))


def test_sniff_and_probe():
    enc = encode_webp_lossless(np.zeros((6, 9), np.uint8))
    assert sniff_media(enc) == "image/webp"
    p = probe_media(enc)
    assert (p["kind"], p["width"], p["height"]) == ("image/webp", 9, 6)


def test_decode_stage_end_to_end(ray_session):
    """CodecDecoder (fake=False) decodes WebP payloads through the
    actor-pool stage; a lossy payload is dropped by on_error='skip'."""
    import pyarrow as pa
    import ray.data

    from exactextractr_ray.stages.multimodal import decode_images

    hw = 16
    yy, xx = np.meshgrid(np.arange(hw), np.arange(hw), indexing="ij")
    payloads = [
        encode_webp_lossless(
            ((m * 11 + yy * 5 + xx * 3) % 256).astype(np.uint8),
            subtract_green=(m % 2 == 0), cache_bits=3 if m % 3 == 0 else 0,
        )
        for m in range(6)
    ]
    # a lossy-looking VP8 payload: keyframe header only (undecodable)
    lossy = (b"RIFF" + (20).to_bytes(4, "little") + b"WEBP" + b"VP8 "
             + (12).to_bytes(4, "little")
             + b"\x00\x00\x00\x9d\x01\x2a\x10\x00\x10\x00\x00\x00")
    payloads.append(lossy)
    tbl = pa.table({
        "media_id": pa.array(np.arange(7, dtype=np.int64)),
        "media_type": pa.array(["image/webp"] * 7),
        "payload": pa.array(payloads, pa.binary()),
        "width": pa.array([hw] * 7, pa.int32()),
        "height": pa.array([hw] * 7, pa.int32()),
    })
    dec = decode_images(ray.data.from_arrow(tbl), target_hw=(hw, hw),
                        fake=False, on_error="skip", batch_size=4,
                        concurrency=(1, 2))
    rows = dec.to_pandas().sort_values("media_id")
    assert rows["media_id"].tolist() == [0, 1, 2, 3, 4, 5]  # lossy dropped
    for _, row in rows.iterrows():
        m = int(row["media_id"])
        px = np.asarray(row["pixels"], np.float32).reshape(hw, hw)
        expect = ((m * 11 + yy * 5 + xx * 3) % 256).astype(np.float32)
        assert np.array_equal(px, expect)
