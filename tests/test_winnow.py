"""Winnowing (MOSS) fingerprint selection: the SIGMOD 2003 guarantees,
tie-breaking, and the shuffle-free Ray stage."""

import numpy as np
import pyarrow as pa
import pytest

from exactextractr_ray.stages.winnow import winnow_batch, winnow_fingerprints


def _fps(texts, k=4, w=3):
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    out = winnow_batch(t, k=k, w=w)
    return out.to_pandas()


def test_guarantee_shared_substring_detected():
    """Paper §3: any match of length >= w + k - 1 must share at least one
    selected fingerprint. k=4, w=3 -> threshold 6 chars."""
    rng = np.random.default_rng(7)
    alpha = "abcdefghij"
    base = "".join(rng.choice(list(alpha), size=60))
    shared = "zqzxvyw"  # 7 > w + k - 1
    t0 = base[:20] + shared + base[20:40]
    t1 = base[40:] + shared + base[:15]
    df = _fps([t0, t1], k=4, w=3)
    f0 = set(df[df.doc_id == 0].fp)
    f1 = set(df[df.doc_id == 1].fp)
    common = f0 & f1
    assert common, "shared 7-gram substring must produce a common fingerprint"


def test_density_bound():
    """Expected density ~ 2/(w+1); must never exceed one per window and
    always keep at least one per w consecutive grams (coverage)."""
    rng = np.random.default_rng(11)
    text = "".join(rng.choice(list("abcdefghijklmnop"), size=2000))
    k, w = 8, 4
    df = _fps([text], k=k, w=w)
    m = len(text) - k + 1
    assert len(df) <= m - w + 1
    pos = np.sort(df.pos.to_numpy())
    # coverage: every window of w consecutive gram positions has a selection
    assert pos[0] <= w - 1
    assert (np.diff(pos) <= w).all()
    # density near the paper's 2/(w+1) for random text
    assert len(df) / m == pytest.approx(2 / (w + 1), rel=0.25)


def test_rightmost_tie_rule():
    """Identical hashes in one window select the RIGHTMOST position:
    'aaaaa' with k=2, w=3 has equal gram hashes everywhere -> selected set
    is exactly the rightmost position of each window."""
    df = _fps(["aaaaaa"], k=2, w=3)
    # grams at pos 0..4 all hash equal; windows end at 2,3,4 -> select 2,3,4
    assert list(df.pos) == [2, 3, 4]


def test_short_docs_select_nothing():
    """Fewer than w grams -> no full window -> no fingerprints."""
    df = _fps(["abcd", "abcdef"], k=4, w=4)  # 1 and 3 grams, both < w
    assert len(df) == 0


def test_winnow_dataset_matches_batch(ray_session):
    import ray

    texts = ["the quick brown fox jumps over the lazy dog " * 3,
             "pack my box with five dozen liquor jugs " * 2]
    t = pa.table(
        {
            "doc_id": pa.array([10, 20], pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    want = winnow_batch(t, k=8, w=4).to_pandas()
    got = (
        winnow_fingerprints(ray.data.from_arrow(t), k=8, w=4)
        .to_pandas()
        .sort_values(["doc_id", "pos"])
        .reset_index(drop=True)
    )
    want = want.sort_values(["doc_id", "pos"]).reset_index(drop=True)
    assert got.equals(want)
