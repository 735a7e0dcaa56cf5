"""Exact duplicated-substring spans (character-level corpus dedup,
Lee et al. 2022 semantics): a position is duplicated when its k-gram
occurs >= 2 times anywhere in the corpus (same-document repeats count);
duplicated positions merge into maximal [start, end) spans."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


@pytest.fixture
def _ray(ray_session):
    yield


def _docs_ds(rows):
    import ray.data

    ids, texts = zip(*rows) if rows else ((), ())
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(ids), pa.int64()),
                "text": pa.array(list(texts), pa.string()),
            }
        )
    )


def _spans(rows, k, **kw):
    from exactextractr_ray.stages.dedup import substr_dup_spans

    df = substr_dup_spans(_docs_ds(rows), k=k, **kw).to_pandas()
    # all-empty results can come back column-less (see operator docstring)
    df = df.reindex(columns=["doc_id", "span_start", "span_end"])
    return (
        df.sort_values(["doc_id", "span_start"])
        .reset_index(drop=True)
        .astype(np.int64)
    )


def _ref_spans(rows, k):
    """Single-process reference: count every k-gram across the corpus, mark
    positions whose k-gram count >= 2, merge contiguous/overlapping windows."""
    from collections import Counter

    cnt = Counter()
    for _, t in rows:
        for i in range(len(t) - k + 1):
            cnt[t[i : i + k]] += 1
    out = []
    for doc_id, t in rows:
        pos = [i for i in range(len(t) - k + 1) if cnt[t[i : i + k]] >= 2]
        if not pos:
            continue
        start = prev = pos[0]
        for p in pos[1:]:
            if p > prev + k:
                out.append((doc_id, start, prev + k))
                start = p
            prev = p
        out.append((doc_id, start, prev + k))
    return (
        pd.DataFrame(out, columns=["doc_id", "span_start", "span_end"])
        .sort_values(["doc_id", "span_start"])
        .reset_index(drop=True)
        .astype(np.int64)
    )


def test_cross_doc_dup(_ray):
    # the shared sentence is 26 chars: every k=8 window inside it repeats
    shared = "the quick brown fox jumps!"
    rows = [(1, "AAAA " + shared + " BBBB"), (2, "CCCCCC " + shared + " D")]
    got = _spans(rows, k=8)
    exp = _ref_spans(rows, k=8)
    pd.testing.assert_frame_equal(got, exp)
    # the shared run includes the flanking spaces both docs carry:
    # " the quick brown fox jumps! " = 28 chars, at offsets 4 and 6
    assert got.iloc[0].tolist() == [1, 4, 4 + 28]
    assert got.iloc[1].tolist() == [2, 6, 6 + 28]


def test_same_doc_repeat_counts(_ray):
    # a k-gram repeated WITHIN one document is duplicated (all occurrences
    # count), even though no other document shares it
    rows = [(7, "xyzw1234xyzw1234 tail"), (8, "unrelated text here")]
    got = _spans(rows, k=8)
    exp = _ref_spans(rows, k=8)
    pd.testing.assert_frame_equal(got, exp)
    assert (got["doc_id"] == 7).all()


def test_no_dups_empty(_ray):
    rows = [(1, "abcdefgh"), (2, "ijklmnop"), (3, "")]
    got = _spans(rows, k=8)
    assert len(got) == 0


def test_short_docs_skipped(_ray):
    # docs shorter than k contribute no windows and never straddle into
    # neighbours despite the concatenated batch hashing
    rows = [(1, "abc"), (2, "abcabcab"), (3, "cabcabca")]
    got = _spans(rows, k=8)
    exp = _ref_spans(rows, k=8)
    pd.testing.assert_frame_equal(got, exp)


def test_adjacent_windows_chain(_ray):
    # two duplicated windows separated by exactly k merge into one span
    # (touching rule: p <= prev + k chains)
    base = "0123456789" * 4
    rows = [(1, base), (2, base[:17] + "ZZZ" + base[20:])]
    got = _spans(rows, k=5)
    exp = _ref_spans(rows, k=5)
    pd.testing.assert_frame_equal(got, exp)


def test_partition_invariance(_ray):
    rng = np.random.default_rng(42)
    vocab = ["lorem", "ipsum", "dolor", "sit", "amet", "sed", "do"]
    rows = []
    for i in range(60):
        words = rng.choice(vocab, size=rng.integers(5, 30)).tolist()
        rows.append((i, " ".join(words)))
    exp = _ref_spans(rows, k=12)
    got1 = _spans(rows, k=12)
    pd.testing.assert_frame_equal(got1, exp)
    # different block structure, coarse-group count, and join partitioning
    from exactextractr_ray.stages.dedup import substr_dup_spans

    df = substr_dup_spans(
        _docs_ds(rows).repartition(11), k=12, num_partitions=3, ncoarse=4
    ).to_pandas()
    got2 = (
        df.reindex(columns=["doc_id", "span_start", "span_end"])
        .sort_values(["doc_id", "span_start"])
        .reset_index(drop=True)
        .astype(np.int64)
    )
    pd.testing.assert_frame_equal(got2, exp)


def test_unicode_codepoints(_ray):
    # non-ASCII codepoints hash identically wherever they appear (the
    # operator hashes codepoints, not bytes); spans are CHARACTER offsets
    shared = "héllo wörld ünïcode ça va bien"
    rows = [(1, "x" + shared), (2, shared + "yy")]
    got = _spans(rows, k=10)
    exp = _ref_spans(rows, k=10)
    pd.testing.assert_frame_equal(got, exp)


def _brute_maximal(docs, min_len, cap):
    """O(n^2) reference for maximal_dup_spans: per position the true
    longest-elsewhere-match (capped), then the left-maximality filter."""
    import pandas as pd

    texts = dict(docs)
    allpos = [(d, p) for d, t in docs for p in range(len(t))]
    Ls = {}
    for d, p in allpos:
        w = texts[d][p:p + cap]
        best = 0
        for d2, p2 in allpos:
            if (d2, p2) == (d, p):
                continue
            w2 = texts[d2][p2:p2 + cap]
            m = min(len(w), len(w2))
            l = 0
            while l < m and w[l] == w2[l]:
                l += 1
            best = max(best, l)
        Ls[(d, p)] = best
    out = []
    for d, t in docs:
        for p in range(len(t)):
            l = Ls[(d, p)]
            if l < min_len:
                continue
            if p > 0 and Ls[(d, p - 1)] >= l + 1:
                continue
            out.append((d, p, p + l))
    return pd.DataFrame(out, columns=["doc_id", "span_start", "span_end"])


def test_maximal_dup_spans_vs_brute(ray_session):
    """Maximal-span semantics (Lee et al. §3): chimera-splitting,
    same-doc repeats, left-maximality and the p=0 edge — all against an
    O(n^2) longest-match reference."""
    import pyarrow as pa
    import ray

    from exactextractr_ray.stages.dedup import maximal_dup_spans

    docs = [
        (0, "the quick brown fox jumps over the lazy dog AND NOW "
            "something else entirely here"),
        (1, "xx the quick brown fox jumps over the lazy cat PLUS "
            "unrelated tail content zz"),
        (2, "zzz AND NOW something different follows ppp qq rr ss tt"),
        (3, "no duplicate content in this one at all just unique"),
        # same-document repeat
        (4, "abcdefghijKLM---1---abcdefghijKLM---2---end"),
    ]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([d for d, _ in docs], pa.int64()),
        "text": pa.array([t for _, t in docs], pa.string()),
    }))
    for min_len, cap in ((10, 32), (8, 16)):
        got = (
            maximal_dup_spans(ds, min_len=min_len, cap=cap)
            .to_pandas()
            .sort_values(["doc_id", "span_start"])
            .reset_index(drop=True)
            .astype("int64")
        )
        exp = (
            _brute_maximal(docs, min_len, cap)
            .sort_values(["doc_id", "span_start"])
            .reset_index(drop=True)
            .astype("int64")
        )
        assert got.equals(exp), (min_len, cap)


def test_maximal_dup_spans_no_dups(ray_session):
    import pyarrow as pa
    import ray

    from exactextractr_ray.stages.dedup import maximal_dup_spans

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["completely unique alpha beta",
                          "nothing shared gamma delta"], pa.string()),
    }))
    df = maximal_dup_spans(ds, min_len=10, cap=32).to_pandas()
    df = df.reindex(columns=["doc_id", "span_start", "span_end"])
    assert len(df) == 0


def test_excise_spans_composition(ray_session):
    """maximal_dup_spans -> excise_spans removes exactly the union of
    covered characters and keeps untouched documents intact."""
    import pyarrow as pa
    import ray

    from exactextractr_ray.stages.dedup import excise_spans, maximal_dup_spans

    docs = [
        (0, "HEADER the quick brown fox jumps over it TAIL-A unique one"),
        (1, "HEADER the quick brown fox jumps over it TAIL-B other text"),
        (2, "completely unique document body with no repeats at all"),
    ]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([d for d, _ in docs], pa.int64()),
        "text": pa.array([t for _, t in docs], pa.string()),
    }))
    spans = maximal_dup_spans(ds, min_len=12, cap=48)
    sp = spans.to_pandas()
    out = excise_spans(ds, spans).to_pandas().set_index("doc_id")
    texts = dict(docs)
    for d, t in docs:
        mine = sp[sp.doc_id == d]
        covered = set()
        for r in mine.itertuples():
            covered.update(range(int(r.span_start), int(r.span_end)))
        exp = "".join(c for i, c in enumerate(t) if i not in covered)
        assert out.loc[d, "clean_text"] == exp, d
        assert out.loc[d, "n_removed"] == len(covered)
        assert out.loc[d, "n_spans"] == len(mine)
    # doc 2 is untouched, docs 0/1 lost their shared prefix region
    assert out.loc[2, "clean_text"] == texts[2]
    assert out.loc[0, "n_removed"] > 20 and out.loc[1, "n_removed"] > 20
