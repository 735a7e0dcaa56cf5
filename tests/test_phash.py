"""DCT perceptual hash (stages/multimodal.py phash_batch /
image_phash_pairs): independent-DCT re-derivation, robustness vs dHash
on blurred/noised near-dups, and the real-codec pairs chain."""

import numpy as np
import pyarrow as pa
import pytest


def _dct2_direct(img: np.ndarray) -> np.ndarray:
    """O(N^4) textbook DCT-II — independent of the stage's matmul path."""
    n = img.shape[0]
    out = np.zeros((8, 8))
    for u in range(8):
        for v in range(8):
            cu = np.sqrt(0.5) if u == 0 else 1.0
            cv = np.sqrt(0.5) if v == 0 else 1.0
            s = 0.0
            for y in range(n):
                for x in range(n):
                    s += img[y, x] * np.cos(np.pi * (2 * y + 1) * u / (2 * n)) \
                        * np.cos(np.pi * (2 * x + 1) * v / (2 * n))
            out[u, v] = s * cu * cv * 2.0 / n
    return out


def _phash_reference(img: np.ndarray) -> int:
    low = _dct2_direct(img.astype(np.float64)).reshape(64)
    ac = low[1:]
    med = np.median(ac)
    # assert a stability margin: no coefficient within float noise of
    # the median (the bit-stability precondition the stage documents)
    gaps = np.abs(ac - med)
    gaps = gaps[gaps > 0]
    assert gaps.min() > 1e-9
    h = 0
    for i, v in enumerate(ac, start=1):
        if v > med:
            h |= 1 << i
    return h


def _smooth_field(seed: int) -> np.ndarray:
    """Dense-spectrum smooth random field — the natural-image regime
    pHash is designed for (a sparse sinusoid has near-zero AC median
    and unstable sign bits, which is a property, not a bug)."""
    rng = np.random.RandomState(seed)
    f = rng.normal(0, 1, (32, 32))
    for _ in range(6):
        f = (np.roll(f, 1, 0) + np.roll(f, -1, 0)
             + np.roll(f, 1, 1) + np.roll(f, -1, 1) + 4 * f) / 8.0
    return 128 + 60 * f / np.abs(f).max()


def _thumb_batch(imgs):
    n = len(imgs)
    flat = np.concatenate([i.astype(np.float32).ravel() for i in imgs])
    return pa.table({
        "media_id": pa.array(np.arange(n, dtype=np.int64)),
        "pix_h": pa.array([32] * n, pa.int32()),
        "pix_w": pa.array([32] * n, pa.int32()),
        "pixels": pa.ListArray.from_arrays(
            pa.array(np.arange(n + 1) * 32 * 32, pa.int32()),
            pa.array(flat, pa.float32()),
        ),
    })


def test_phash_matches_independent_dct():
    from exactextractr_ray.stages.multimodal import phash_batch

    rng = np.random.RandomState(4)
    imgs = [rng.randint(0, 256, (32, 32)).astype(np.float64)
            for _ in range(3)]
    got = phash_batch(_thumb_batch(imgs))["phash"].to_pylist()
    for i, img in enumerate(imgs):
        assert got[i] == _phash_reference(img), i


def test_phash_robust_to_noise():
    """pHash of a smooth image survives mild noise (small Hamming
    distance) while a different image is far — the frequency-domain
    robustness that motivates it next to dHash."""
    from exactextractr_ray.stages.multimodal import phash_batch

    base = _smooth_field(seed=9)
    rng = np.random.RandomState(9)
    noisy = base + rng.normal(0, 3.0, base.shape)
    other = 255 - base.T
    h = phash_batch(_thumb_batch([base, noisy, other]))["phash"].to_pylist()

    def ham(a, b):
        return bin(int(a) ^ int(b)).count("1")

    assert ham(h[0], h[1]) <= 6
    assert ham(h[0], h[2]) > 16


def test_image_phash_pairs_png(ray_session):
    """Real PNG decode -> pHash -> banded Hamming pairs: two noisy
    variants of one scene pair up; an unrelated scene does not."""
    import ray

    from exactextractr_ray.functions.codecs import encode_png
    from exactextractr_ray.stages.multimodal import image_phash_pairs

    base = _smooth_field(seed=11)
    rng = np.random.RandomState(11)
    imgs = [
        np.clip(base, 0, 255).astype(np.uint8),
        np.clip(base + rng.normal(0, 2.0, base.shape), 0, 255)
        .astype(np.uint8),
        np.clip(255 - base.T, 0, 255).astype(np.uint8),
    ]
    tbl = pa.table({
        "media_id": pa.array([0, 1, 2], pa.int64()),
        "media_type": pa.array(["image/png"] * 3),
        "payload": pa.array([encode_png(i) for i in imgs], pa.binary()),
        "width": pa.array([32] * 3, pa.int32()),
        "height": pa.array([32] * 3, pa.int32()),
    })
    pairs = image_phash_pairs(
        ray.data.from_arrow(tbl), max_hamming=8, fake=False,
        concurrency=(1, 2),
    ).to_pandas()
    got = {tuple(sorted((int(a), int(b))))
           for a, b in zip(pairs.iloc[:, 0], pairs.iloc[:, 1])}
    assert (0, 1) in got
    assert (0, 2) not in got and (1, 2) not in got
