"""Distributed multi-round BPE trainer (stages/bpe.py) vs the classic
single-process Sennrich reference — same merges, counts and tie-breaks at
any parallelism; plus the encode (application) side."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from exactextractr_ray.stages.bpe import (
    bpe_encode_batch,
    bpe_train,
    bpe_train_reference,
)

CORPUS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "wider wider wider new new",
    "the quick brown fox jumps over the lazy dog",
    "the the the banana bandana cabana",
    "",
]


def test_reference_matches_sennrich_worked_example():
    """The canonical low/lower/newest/widest corpus from Sennrich et al.
    2016 §3.2: first merges are (e,s) -> es, (es,t) -> est, ..."""
    texts = (
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    )
    ref = bpe_train_reference([" ".join(texts)], num_merges=4)
    got = list(zip(ref["left"], ref["right"]))
    assert got[:3] == [("e", "s"), ("es", "t"), ("est", "</w>")]


def test_distributed_matches_reference(ray_session):
    import ray.data

    ds = ray.data.from_arrow(
        pa.table({"doc_id": np.arange(len(CORPUS)), "text": CORPUS})
    ).repartition(4)
    got = bpe_train(ds, num_merges=10)
    want = bpe_train_reference(CORPUS, num_merges=10)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True)
    )
    assert len(got) == 10
    # merged column is the concatenation, counts strictly usable
    assert (got["merged"] == got["left"] + got["right"]).all()
    assert (got["cnt"] >= 1).all()


def test_distributed_min_freq(ray_session):
    import ray.data

    ds = ray.data.from_arrow(pa.table({"text": CORPUS}))
    got = bpe_train(ds, num_merges=5, min_freq=3)
    want = bpe_train_reference(CORPUS, num_merges=5, min_freq=3)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True)
    )


def test_max_words_cap_path(ray_session):
    """Vocab cap: top max_words by (cnt DESC, word ASC) survive (logged
    drop, not silent); merges equal the reference trained on only the
    surviving words."""
    import ray.data

    texts = ["aaa bbb ccc ddd eee " * 3, "aaa bbb xyz qq rr ss tt"]
    ds = ray.data.from_arrow(pa.table({"text": texts}))
    got = bpe_train(ds, num_merges=3, max_words=3)
    # survivors: aaa(4) bbb(4) ccc(3) — reference corpus of just those
    want = bpe_train_reference(
        ["aaa aaa aaa aaa bbb bbb bbb bbb ccc ccc ccc"], num_merges=3
    )
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True)
    )


def test_encode_batch_compresses_trained_words():
    """After training, frequent words collapse to fewer tokens than
    chars+1; untrained words stay at chars+1."""
    ref = bpe_train_reference(CORPUS, num_merges=20)
    merges = list(zip(ref["left"], ref["right"]))
    batch = pa.table(
        {"doc_id": pa.array([0, 1], pa.int64()),
         "text": pa.array(["newest newest", "zzqqy"], pa.string())}
    )
    out = bpe_encode_batch(batch, merges)
    toks = out.column("bpe_tokens").to_pylist()
    assert toks[0] < 2 * (len("newest") + 1)
    assert toks[1] == len("zzqqy") + 1
    assert "text" not in out.column_names


def test_merge_apply_overlap_semantics(ray_session):
    """Left-to-right non-overlapping: 'aaa' under merge (a,a) becomes
    [aa, a, </w>], so the trainer's second round sees pair (aa, a)."""
    import ray.data

    ds = ray.data.from_arrow(pa.table({"text": ["aaa aaa aaa"]}))
    got = bpe_train(ds, num_merges=2)
    want = bpe_train_reference(["aaa aaa aaa"], num_merges=2)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True)
    )
    assert (got.loc[0, "left"], got.loc[0, "right"]) == ("a", "a")
