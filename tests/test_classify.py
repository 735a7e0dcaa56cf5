"""Blocklist gate + hashed linear classifier: tie rules, empty docs,
custom weights, and dataset-path equivalence."""

import numpy as np
import pyarrow as pa

from exactextractr_ray.stages.classify import (
    HashedLinearClassifier,
    blocklist_batch,
    classify_documents,
)


def _tbl(texts, ids=None):
    ids = ids if ids is not None else list(range(len(texts)))
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )


def test_blocklist_counts_whole_tokens_only():
    out = blocklist_batch(
        _tbl(["slow query slow", "slowest query", "", "fine text"]),
        terms=("slow", "bad"),
    ).to_pandas()
    assert list(out.n_blocked) == [2, 0, 0, 0]  # 'slowest' is NOT a match
    assert list(out.keep) == [0, 1, 1, 1]


def test_classifier_custom_weights_and_tie_rule():
    # 2 classes, 4 buckets; craft weights so doc tokens give a tie ->
    # smallest class must win
    w = np.zeros((2, 4), dtype=np.int64)
    w[0, :] = 5
    w[1, :] = 5
    cls = HashedLinearClassifier(weights=w)
    out = cls(_tbl(["a b c"])).to_pandas()
    assert list(out.pred_class) == [0]  # tie -> smallest class id
    assert list(out.score) == [15]
    # break the tie toward class 1
    w2 = w.copy()
    w2[1, :] = 6
    out2 = HashedLinearClassifier(weights=w2)(_tbl(["a b c"])).to_pandas()
    assert list(out2.pred_class) == [1]
    assert list(out2.score) == [18]


def test_classifier_drops_tokenless_docs():
    cls = HashedLinearClassifier(n_classes=2, n_buckets=8)
    out = cls(_tbl(["", "  ", "word here"], ids=[7, 8, 9])).to_pandas()
    assert list(out.doc_id) == [9]


def test_classifier_deterministic_demo_weights():
    a = HashedLinearClassifier(n_classes=3, n_buckets=16)
    b = HashedLinearClassifier(n_classes=3, n_buckets=16)
    np.testing.assert_array_equal(a.w, b.w)
    assert a.w.min() >= -1000 and a.w.max() <= 1000


def test_classify_dataset_matches_batch(ray_session):
    import ray

    t = _tbl(["alpha beta gamma", "delta epsilon", "zeta"], ids=[1, 2, 3])
    want = HashedLinearClassifier(n_classes=4, n_buckets=512)(t).to_pandas()
    got = (
        classify_documents(ray.data.from_arrow(t))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got.equals(want.sort_values("doc_id").reset_index(drop=True))
