"""Unigram-LM tokenizer (stages/unigram.py, Kudo 2018 hard-EM variant):
distributed-vs-reference bit identity, Viterbi determinism, encode
behavior incl. [UNK] fallback."""

import numpy as np
import pyarrow as pa
import pytest


TEXTS = [
    "the cat sat on the mat the cat ran",
    "the dog sat on the log the dog ran away",
    "cats and dogs running on mats and logs",
    "unseen words are split into characters",
    "tokenization tokenizer tokens token",
] * 2


def _ds(ray_session):
    import ray

    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(TEXTS)), pa.int64()),
        "text": pa.array(TEXTS, pa.string()),
    }))


def _wc():
    wc = {}
    for t in TEXTS:
        for w in t.split():
            wc[w] = wc.get(w, 0) + 1
    return wc


def test_train_matches_reference(ray_session):
    from exactextractr_ray.stages.unigram import (
        unigram_train,
        unigram_train_reference,
    )

    got = unigram_train(_ds(ray_session), vocab_size=48, seed_size=256)
    exp = unigram_train_reference(_wc(), vocab_size=48, seed_size=256)
    assert got.equals(exp)
    # every single corpus character survives (coverage floor) or was
    # never needed; logp sums to a proper distribution
    assert np.isclose(np.exp(got["logp"]).sum(), 1.0)


def test_train_parallelism_invariant(ray_session):
    """Hard-EM integer counts: the SAME table at different block
    structures (the 4-vs-16 byte-identity argument in miniature)."""
    import ray

    from exactextractr_ray.stages.unigram import unigram_train

    a = unigram_train(_ds(ray_session), vocab_size=48, seed_size=256)
    ds2 = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(TEXTS)), pa.int64()),
        "text": pa.array(TEXTS, pa.string()),
    })).repartition(7)
    b = unigram_train(ds2, vocab_size=48, seed_size=256)
    assert a.equals(b)


def test_viterbi_tiebreaks():
    from exactextractr_ray.stages.unigram import _viterbi_segment

    # equal probabilities: prefer fewer pieces
    logp = {"ab": -1.0, "a": -0.5, "b": -0.5}
    assert _viterbi_segment("ab", logp, 8) == ["ab"]
    # uncoverable -> None
    assert _viterbi_segment("xyz", {"x": -1.0}, 8) is None
    # empty word -> empty segmentation
    assert _viterbi_segment("", logp, 8) == []


def test_encode_unk_fallback(ray_session):
    import ray

    from exactextractr_ray.stages.unigram import (
        UNK,
        unigram_encode,
        unigram_train,
    )

    ds = _ds(ray_session)
    vocab = unigram_train(ds, vocab_size=48, seed_size=256)
    enc_ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["the cat sat", "zzzzéé"], pa.string()),
    }))
    out = unigram_encode(enc_ds, vocab).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    assert out.loc[0, "n_unk"] == 0
    assert out.loc[0, "tokens_concat"].startswith("the")
    # a word with characters absent from the corpus becomes one [UNK]
    assert out.loc[1, "n_unk"] == 1
    assert out.loc[1, "tokens_concat"] == UNK
