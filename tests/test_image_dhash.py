"""Image perceptual-hash near-dup (stages/multimodal.py dhash_batch /
image_dhash_pairs) and the generalized Hamming banding it rides on
(stages/dedup.py hamming_pairs).

Evidence: hand-computed dHash goldens, brute-force pair oracles in numpy,
and the REAL PNG decode path end-to-end on rule-generated fixtures.
"""

import numpy as np
import pyarrow as pa
import pytest

from exactextractr_ray.stages.multimodal import (
    dhash_batch,
    image_dhash_pairs,
    synth_dhash_png_table,
)


def _rule_image(i, h=16, w=18):
    g, d = i // 4, i % 4
    y, x = np.mgrid[0:h, 0:w]
    return (
        (g * 53 + y * 17 + x * 29 + d * 100 * (((y * 18 + x) % 7) == 0)) % 256
    ).astype(np.uint8)


def _dhash_ref(img):
    """Reference dHash: nearest-resize 16x18 -> 8x9 (picks odd rows/cols),
    horizontal gradient sign, little-endian bit pack."""
    r = img[1::2, 1::2].astype(np.int64)
    bits = (r[:, 1:] > r[:, :-1]).astype(np.uint64)
    return int(
        (bits.ravel() << np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64)
    )


def _popcount(v):
    return bin(int(v)).count("1")


def _brute_pairs(hashes, k):
    out = set()
    for i in range(len(hashes)):
        for j in range(i + 1, len(hashes)):
            hd = _popcount(hashes[i] ^ hashes[j])
            if hd <= k:
                out.add((i, j, hd))
    return out


def _pix_batch(imgs):
    """Fake a decode-stage output batch from 8x9 luma thumbnails."""
    n = len(imgs)
    flat = np.concatenate([im.astype(np.float32).ravel() for im in imgs])
    offs = pa.array(np.arange(n + 1, dtype=np.int32) * 72, pa.int32())
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "pixels": pa.ListArray.from_arrays(
                offs, pa.array(flat, pa.float32())
            ),
            "pix_h": pa.array([8] * n, pa.int32()),
            "pix_w": pa.array([9] * n, pa.int32()),
        }
    )


def test_dhash_golden_tiny():
    """Monotone-increasing rows -> all bits set; constant image -> 0."""
    inc = np.tile(np.arange(9, dtype=np.uint8) * 10, (8, 1))
    const = np.full((8, 9), 7, np.uint8)
    out = dhash_batch(_pix_batch([inc, const]))
    h = out.column("dhash").to_pylist()
    assert h[0] == 2**64 - 1
    assert h[1] == 0


def test_dhash_matches_reference_rule():
    thumbs = [_rule_image(i)[1::2, 1::2] for i in range(12)]
    out = dhash_batch(_pix_batch(thumbs))
    got = out.column("dhash").to_pylist()
    want = [_dhash_ref(_rule_image(i)) for i in range(12)]
    assert got == want


def test_dhash_wrong_thumb_size_rejected():
    bad = _pix_batch([np.zeros((8, 9), np.uint8)])
    bad = bad.set_column(3, "pix_w", pa.array([8], pa.int32()))
    with pytest.raises(ValueError, match="8, 9"):
        dhash_batch(bad)


def test_hamming_pairs_generic_brute_force(ray_session):
    """hamming_pairs over arbitrary uint64 signatures == brute force
    (pigeonhole banding is exhaustive, in-bucket verify exact)."""
    import ray.data

    from exactextractr_ray.stages.dedup import hamming_pairs

    rng = np.random.default_rng(7)
    base = rng.integers(0, 2**63, size=20, dtype=np.uint64)
    # plant near dups: flip <=3 bits of earlier sigs
    sigs = base.copy()
    for i in range(10, 20):
        s = base[i - 10]
        for b in rng.choice(64, size=i % 4, replace=False):
            s ^= np.uint64(1) << np.uint64(b)
        sigs[i] = s
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(20, dtype=np.int64)),
            "sig": pa.array(sigs, pa.uint64()),
        }
    )
    got = (
        hamming_pairs(
            ray.data.from_arrow(tbl), max_hamming=3, sig_col="sig"
        )
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
    )
    got_set = set(
        zip(got["doc_a"], got["doc_b"], got["hamming"])
    )
    assert got_set == _brute_pairs(sigs, 3)
    assert len(got_set) >= 10  # the planted dups all surface


def test_image_dhash_pairs_real_png_end_to_end(ray_session):
    """Real PNG decode -> dHash -> banding matches the numpy brute force
    computed straight from the pixel rule (decode + resize are exact)."""
    import ray.data

    tbl = synth_dhash_png_table(48)
    got = (
        image_dhash_pairs(
            ray.data.from_arrow(tbl), max_hamming=6, fake=False,
            batch_size=16,
        )
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
    )
    hashes = [_dhash_ref(_rule_image(i)) for i in range(48)]
    want = _brute_pairs(hashes, 6)
    got_set = set(zip(got["doc_a"], got["doc_b"], got["hamming"]))
    assert got_set == want
    assert len(want) == 54  # fixture's designed mix (5 exact dups inside)
    assert sum(1 for (_, _, h) in want if h == 0) == 5
