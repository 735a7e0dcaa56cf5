"""CCNet-style LM perplexity bucketing (stages/lm.py): exact fixed-point
scores vs a pure-Python replay, NTILE(3) semantics, fluency ordering,
and parallelism invariance."""

import hashlib

import numpy as np
import pyarrow as pa
import pytest

from exactextractr_ray.stages.lm import (
    LM_PREC,
    _ntile3,
    _token_buckets,
    lm_perplexity_buckets,
)

B = 4096


def _h(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % B


def test_token_buckets_recipe():
    ctx, pair = _token_buckets("a b  c", B)  # double space -> empty dropped
    assert list(ctx) == [_h("a"), _h("b")]
    assert list(pair) == [_h("a b"), _h("b c")]
    ctx1, pair1 = _token_buckets("solo", B)
    assert ctx1.size == 0 and pair1.size == 0
    ctx0, pair0 = _token_buckets("", B)
    assert ctx0.size == 0 and pair0.size == 0


def test_ntile3_matches_sql_semantics():
    # N=7 -> sizes 3,2,2 (earlier buckets larger); N=6 -> 2,2,2
    assert list(_ntile3(np.arange(7), 7)) == [1, 1, 1, 2, 2, 3, 3]
    assert list(_ntile3(np.arange(6), 6)) == [1, 1, 2, 2, 3, 3]
    assert list(_ntile3(np.arange(1), 1)) == [1]


def _reference_scores(docs, train_substr):
    """Pure-Python replay of the documented recipe."""
    ctx_cnt = np.zeros(B, dtype=np.int64)
    pair_cnt = np.zeros(B, dtype=np.int64)
    for _, t in docs:
        if train_substr in t:
            ctx, pair = _token_buckets(t, B)
            np.add.at(ctx_cnt, ctx, 1)
            np.add.at(pair_cnt, pair, 1)
    rows = []
    for did, t in docs:
        ctx, pair = _token_buckets(t, B)
        if ctx.size == 0:
            continue
        surp = ((ctx_cnt[ctx] + B) * LM_PREC) // (pair_cnt[pair] + 1)
        rows.append((did, ctx.size, int(surp.sum()) // ctx.size))
    rows.sort(key=lambda r: r[0])
    return rows


@pytest.fixture()
def corpus():
    # reference subset = docs containing 'ref'; fluent docs reuse its
    # bigrams, gibberish does not
    docs = [
        (0, "ref the cat sat on the mat"),
        (1, "ref the dog sat on the mat"),
        (2, "the cat sat on the mat"),  # fluent: all bigrams seen
        (3, "zqx vbn plm okn ijb uhb"),  # gibberish: unseen bigrams
        (4, "the dog sat on the mat"),
        (5, "solo"),  # < 2 tokens: excluded
        (6, ""),  # empty: excluded
        (7, "mat the on sat cat the"),  # scrambled: mostly unseen
    ]
    return docs


def test_scores_and_buckets_exact(ray_session, corpus):
    import ray.data

    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in corpus], pa.int64()),
                "text": pa.array([t for _, t in corpus], pa.string()),
            }
        )
    )
    out = (
        lm_perplexity_buckets(ds, train_substr="ref")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    ref = _reference_scores(corpus, "ref")
    assert list(out.doc_id) == [r[0] for r in ref]
    assert list(out.n_pairs) == [r[1] for r in ref]
    assert list(out.ppl_fp) == [r[2] for r in ref]
    # tercile assignment = NTILE(3) over (ppl_fp, doc_id)
    order = sorted(ref, key=lambda r: (r[2], r[0]))
    rank = {d: i for i, (d, _, _) in enumerate(order)}
    exp = {
        d: int(_ntile3(np.array([rank[d]]), len(ref))[0]) for d, _, _ in ref
    }
    got = dict(zip(out.doc_id, out.bucket))
    assert got == exp
    # fluency ordering: gibberish lands in the tail tercile and scores
    # strictly worse than the in-distribution doc
    assert got[3] == 3
    ppl = dict(zip(out.doc_id, out.ppl_fp))
    assert ppl[2] < ppl[3] and ppl[7] > ppl[2]


def test_parallelism_invariance(ray_session, corpus):
    import ray.data

    tbl = pa.table(
        {
            "doc_id": pa.array([d for d, _ in corpus], pa.int64()),
            "text": pa.array([t for _, t in corpus], pa.string()),
        }
    )
    one = (
        lm_perplexity_buckets(
            ray.data.from_arrow(tbl), train_substr="ref"
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    many = (
        lm_perplexity_buckets(
            ray.data.from_arrow(tbl).repartition(5), train_substr="ref"
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert one.equals(many)
