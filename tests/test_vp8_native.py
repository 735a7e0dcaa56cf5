"""Lossy WebP (VP8) via the system libwebp (functions/vp8_native.py,
ctypes-gated): decode of a real libwebp-encoded file from this host,
round trips, cross-validation of the from-scratch VP8L decoder against
libwebp as an independent golden, and the dHash chain running fake=False
on lossy payloads."""

import glob

import numpy as np
import pytest

from exactextractr_ray.functions import vp8_native as v

pytestmark = pytest.mark.skipif(
    not v.available(), reason="libwebp not present on this host"
)


def _gradient_rgb(h=40, w=56, seed=0):
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    g = ((seed * 11 + yy * 2 + xx * 3) % 200 + 20).astype(np.uint8)
    return np.dstack([g, g, g])


def test_lossless_roundtrip_exact():
    rng = np.random.RandomState(3)
    rgb = rng.randint(0, 256, (40, 56, 3)).astype(np.uint8)
    data = v.encode_lossless_rgb(rgb)
    back = v.decode_rgba(data)
    assert np.array_equal(back[..., :3], rgb)
    assert (back[..., 3] == 255).all()


def test_lossy_decode_close():
    rgb = _gradient_rgb()
    data = v.encode_rgb(rgb, 90.0)
    back = v.decode_rgba(data)
    assert back.shape == (40, 56, 4)
    assert np.abs(back[..., :3].astype(int) - rgb.astype(int)).max() <= 16
    # deterministic: same input -> same bytes -> same pixels
    assert data == v.encode_rgb(rgb, 90.0)
    assert np.array_equal(back, v.decode_rgba(data))


def test_decode_webp_routes_lossy():
    """functions/webp.py decode_webp: VP8L stays on the pure-Python path,
    'VP8 ' routes through the native gate."""
    from exactextractr_ray.functions.webp import decode_webp

    rgb = _gradient_rgb()
    img = decode_webp(v.encode_rgb(rgb, 95.0))
    assert img.shape == (40, 56, 3)
    assert np.abs(img.astype(int) - rgb.astype(int)).max() <= 12


def test_pure_vp8l_decoder_matches_libwebp():
    """Independent golden: the from-scratch VP8L decoder must reproduce
    LIBWEBP-encoded lossless files byte-for-byte (the encoder here is not
    ours, so this pins the entropy/transform layers externally)."""
    from exactextractr_ray.functions.webp import decode_webp

    rng = np.random.RandomState(9)
    for shape in ((17, 23), (32, 32), (5, 64)):
        rgb = rng.randint(0, 256, (*shape, 3)).astype(np.uint8)
        data = v.encode_lossless_rgb(rgb)
        ours = decode_webp(data)
        theirs = v.decode_rgba(data)
        assert np.array_equal(ours[..., :3] if ours.ndim == 3 else ours,
                              theirs[..., :3]), shape


def test_real_host_webp_file():
    """A real libwebp-encoded VP8X+ALPH+VP8 file shipped with CPython's
    test suite (the 16x16 Python logo) decodes end to end."""
    cands = glob.glob(
        "/root/.pyenv/versions/*/lib/python*/test/test_email/data/"
        "python.webp"
    ) + glob.glob(
        "/root/.pyenv/versions/*/lib/python*/test/imghdrdata/python.webp"
    )
    if not cands:
        pytest.skip("no python.webp on this host")
    data = open(cands[0], "rb").read()
    from exactextractr_ray.functions.webp import decode_webp

    img = decode_webp(data)
    assert img.shape[:2] == (16, 16)
    assert img.shape[2] == 4  # carries real alpha
    assert img[..., 3].min() < 255  # transparent corners


def test_dhash_chain_lossy_fake_false(ray_session):
    """image_dhash_pairs over lossy WebP payloads with fake=False: two
    lossy re-encodes of the same image pair up at small Hamming distance
    while a different image stays out — the real-codec near-dup chain
    with no deterministic-fake step."""
    import pyarrow as pa
    import ray

    from exactextractr_ray.stages.multimodal import image_dhash_pairs

    base = _gradient_rgb(48, 48, seed=1)
    other = 255 - _gradient_rgb(48, 48, seed=5)
    payloads = [
        v.encode_rgb(base, 92.0),
        v.encode_rgb(base, 80.0),   # same content, different quality
        v.encode_rgb(other, 92.0),
    ]
    tbl = pa.table({
        "media_id": pa.array([0, 1, 2], pa.int64()),
        "media_type": pa.array(["image/webp"] * 3),
        "payload": pa.array(payloads, pa.binary()),
        "width": pa.array([48] * 3, pa.int32()),
        "height": pa.array([48] * 3, pa.int32()),
    })
    pairs = image_dhash_pairs(
        ray.data.from_arrow(tbl), max_hamming=6, fake=False,
        concurrency=(1, 2),
    ).to_pandas()
    got = {tuple(sorted((int(a), int(b))))
           for a, b in zip(pairs.iloc[:, 0], pairs.iloc[:, 1])}
    assert (0, 1) in got
    assert (0, 2) not in got and (1, 2) not in got
