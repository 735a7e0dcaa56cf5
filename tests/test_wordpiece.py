"""WordPiece tokenizer (stages/wordpiece.py): distributed trainer vs
single-process reference, greedy longest-match-first encode semantics,
UNK fallback, batch counting."""

import numpy as np
import pyarrow as pa
import pytest

from exactextractr_ray.stages.wordpiece import (
    UNK,
    wordpiece_encode_batch,
    wordpiece_encode_word,
    wordpiece_train,
    wordpiece_train_reference,
    wordpiece_vocab,
)

TEXTS = [
    "low lower lowest low low",
    "new newer newest new",
    "wide wider widest wide wide wide",
    "low newer wide lowest",
] * 3


def test_distributed_matches_reference(ray_session):
    import ray.data

    ds = ray.data.from_items([{"text": t} for t in TEXTS])
    dist = wordpiece_train(ds, num_merges=8)
    ref = wordpiece_train_reference(TEXTS, num_merges=8)
    assert dist.reset_index(drop=True).equals(ref.reset_index(drop=True))
    # likelihood scoring differs from BPE frequency scoring: scores are
    # monotone nonincreasing is NOT guaranteed, but every score > 0
    assert (dist["score"] > 0).all()


def test_reference_prefers_likelihood_over_frequency():
    """'ab' appears 3x but 'a'/'b' are common; 'xy' appears 2x with
    rare x/y — WordPiece must pick the rare-pair merge first (higher
    cnt/(ca*cb)), where plain BPE would pick the frequent pair."""
    texts = ["ab ab ab a b a b a b a b xy xy"]
    ref = wordpiece_train_reference(texts, num_merges=1)
    assert ref.iloc[0]["left"] == "x" and ref.iloc[0]["right"] == "##y"


def test_greedy_longest_match():
    vocab = {"a", "ab", "abc", "##c", "##d", "##cd"}
    assert wordpiece_encode_word("abc", vocab) == ["abc"]
    assert wordpiece_encode_word("abcd", vocab) == ["abc", "##d"]
    assert wordpiece_encode_word("abd", vocab) == ["ab", "##d"]
    assert wordpiece_encode_word("acd", vocab) == ["a", "##cd"]


def test_unk_fallback_is_whole_word():
    vocab = {"a", "##b"}
    assert wordpiece_encode_word("abz", vocab) == [UNK]
    assert wordpiece_encode_word("zab", vocab) == [UNK]
    assert wordpiece_encode_word("ab", vocab) == ["a", "##b"]


def test_encode_batch_counts():
    ref = wordpiece_train_reference(TEXTS, num_merges=8)
    vocab = wordpiece_vocab(
        ref, (w for t in TEXTS for w in t.split())
    )
    b = pa.table({"doc_id": [0, 1], "text": ["low lowest", "zzz ¤¤"]})
    out = wordpiece_encode_batch(b, vocab).to_pydict()
    want0 = sum(
        len(wordpiece_encode_word(w, vocab)) for w in "low lowest".split()
    )
    assert out["wp_tokens"][0] == want0 and out["wp_unks"][0] == 0
    # '¤' never appears in the corpus alphabet -> [UNK]; 'z' neither
    assert out["wp_tokens"][1] == 2 and out["wp_unks"][1] == 2


def test_vocab_contains_alphabet_and_pieces():
    ref = wordpiece_train_reference(TEXTS, num_merges=4)
    vocab = wordpiece_vocab(ref, (w for t in TEXTS for w in t.split()))
    assert "l" in vocab and "##o" in vocab
    for p in ref["piece"]:
        assert p in vocab
