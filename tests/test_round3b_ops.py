"""Round-3 second-wave training-data operators: corpus-level duplicate-span
removal, URL canonicalization/dedup, bigram-LM coherence, SemDeDup."""

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


def _span_dedup(rows, **kw):
    from exactextractr_ray.stages.dedup import dup_span_dedup

    df = dup_span_dedup(_docs_ds(rows), **kw).to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True)


def test_dup_spans_basic(_ray):
    # window=2: doc1 spans ("a b","c d"), doc2 spans ("a b","x y") ->
    # "a b" is in 2 docs -> dropped from BOTH
    df = _span_dedup([(1, "a b c d"), (2, "a b x y")], window=2)
    assert df["clean_text"].tolist() == ["c d", "x y"]
    assert df["n_spans"].tolist() == [2, 2]
    assert df["n_dropped"].tolist() == [1, 1]


def test_dup_spans_within_doc_repeat_not_dropped(_ray):
    # the SAME span twice in ONE doc: df counts distinct docs, so it stays
    df = _span_dedup([(1, "a b a b"), (2, "c d e f")], window=2)
    assert df["clean_text"].tolist() == ["a b a b", "c d e f"]
    assert df["n_dropped"].tolist() == [0, 0]


def test_dup_spans_all_dropped_and_tail(_ray):
    # doc3's single short span (tail window < window words) matches doc4's
    # tail -> both drop; doc3 becomes empty string
    df = _span_dedup([(3, "p q"), (4, "r s t u p q")], window=4)
    assert df.loc[df.doc_id == 3, "clean_text"].iloc[0] == ""
    assert df.loc[df.doc_id == 4, "clean_text"].iloc[0] == "r s t u"
    assert df["n_dropped"].tolist() == [1, 1]


def test_dup_spans_min_df_and_cap(_ray):
    rows = [(1, "a b c d"), (2, "a b c d"), (3, "a b z z")]
    # min_df=3: only "a b" (3 docs) crosses; "c d" (2 docs) survives
    df = _span_dedup(rows, window=2, min_df=3)
    assert df["clean_text"].tolist() == ["c d", "c d", "z z"]
    # max_spans=0 disables every drop (cap keeps zero spans)
    df2 = _span_dedup(rows, window=2, max_spans=0)
    assert df2["n_dropped"].tolist() == [0, 0, 0]


def test_dup_spans_parallelism_invariant(_ray):
    rows = [(i, f"w{i % 3} x{i % 3} common tail words here now")
            for i in range(40)]
    a = _span_dedup(rows, window=4)
    from exactextractr_ray.stages.dedup import dup_span_dedup

    b = (
        dup_span_dedup(_docs_ds(rows).repartition(13), window=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


# ---------------------------------------------------------------------------
# URL canonicalization + dedup
# ---------------------------------------------------------------------------


def _canon(urls):
    from exactextractr_ray.stages.web import canonicalize_url_batch

    t = canonicalize_url_batch(
        pa.table({"url": pa.array(urls, pa.string())})
    )
    return t.column("canonical_url").to_pylist()


def test_canonicalize_rules(_ray):
    assert _canon(
        [
            "https://A.Example/Path?x=1#frag",       # host lower, path case kept
            "https://a.example:443/p",               # default https port
            "http://a.example:80/p",                 # default http port
            "http://a.example:8080/p",               # NON-default port kept
            "https://a.example/p?utm_source=x&b=2",  # utm dropped, b kept
            "https://a.example/p?a=1&utm_medium=m",  # trailing utm + its &
            "https://a.example/p?utm_a=1&utm_b=2",   # all-utm query loses ?
            "https://a.example/p/",                  # one trailing slash
        ]
    ) == [
        "https://a.example/Path?x=1",
        "https://a.example/p",
        "http://a.example/p",
        "http://a.example:8080/p",
        "https://a.example/p?b=2",
        "https://a.example/p?a=1",
        "https://a.example/p",
        "https://a.example/p",
    ]


def test_canonicalize_param_order_kept(_ray):
    assert _canon(["https://a.example/p?z=1&utm_x=0&a=2"]) == [
        "https://a.example/p?z=1&a=2"
    ]


def _url_rows(rows):
    import ray.data

    ids, urls, ts = zip(*rows)
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(ids), pa.int64()),
                "url": pa.array(list(urls), pa.string()),
                "fetch_ts": pa.array(list(ts), pa.int64()),
            }
        )
    )


def test_url_dedup_latest_wins_then_min_id(_ray):
    from exactextractr_ray.stages.web import url_dedup

    rows = [
        (1, "https://a.example/p", 100),
        (2, "https://A.example/p#x", 300),    # same canonical, later fetch
        (3, "https://a.example/p/", 300),     # tie on ts -> min doc_id (2)
        (7, "https://b.example/q?utm_s=1", 50),
    ]
    df = (
        url_dedup(_url_rows(rows))
        .to_pandas()
        .sort_values("canonical_url")
        .reset_index(drop=True)
    )
    assert df["canonical_url"].tolist() == [
        "https://a.example/p",
        "https://b.example/q",
    ]
    assert df["keeper_doc_id"].tolist() == [2, 7]
    assert df["last_ts"].tolist() == [300, 50]
    assert df["n_urls"].tolist() == [3, 1]


def test_url_dedup_parallelism_invariant(_ray):
    from exactextractr_ray.stages.web import url_dedup

    rows = [
        (i, f"https://s{i % 5}.example/p/{i % 17}{'/' if i % 2 else ''}",
         (i * 13) % 7)
        for i in range(120)
    ]
    a = url_dedup(_url_rows(rows)).to_pandas()
    b = url_dedup(_url_rows(rows).repartition(11)).to_pandas()
    key = ["canonical_url"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True),
    )


# ---------------------------------------------------------------------------
# bigram coherence
# ---------------------------------------------------------------------------


def _coherence(rows, **kw):
    from exactextractr_ray.stages.text import bigram_coherence

    return (
        bigram_coherence(_docs_ds(rows), **kw)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def test_bigram_coherence_values(_ray):
    # corpus: "a b" x2 (docs 1,2), "a c" x1 (doc 3); count(a)=3
    # doc1/doc2: ratio = 2/3 ; doc3: 1/3
    df = _coherence([(1, "a b"), (2, "a b"), (3, "a c")])
    assert df["n_bigrams"].tolist() == [1, 1, 1]
    assert df["coherence"].tolist() == pytest.approx([2 / 3, 2 / 3, 1 / 3])


def test_bigram_coherence_degenerate_docs(_ray):
    df = _coherence([(1, ""), (2, "solo"), (3, "a a a")])
    assert df["n_bigrams"].tolist() == [0, 0, 2]
    assert np.isnan(df["coherence"].iloc[0]) and np.isnan(df["coherence"].iloc[1])
    # "a a" occurs twice, count(a)=3 -> mean of (2/3, 2/3)
    assert df["coherence"].iloc[2] == pytest.approx(2 / 3)


def test_bigram_coherence_shuffled_text_scores_lower(_ray):
    base = "the quick brown fox jumps over the lazy dog " * 3
    shuf = "dog the over quick lazy fox the brown jumps " * 3
    docs = [(i, base) for i in range(8)] + [(99, shuf)]
    df = _coherence(docs)
    coh = dict(zip(df.doc_id, df.coherence))
    assert coh[99] < coh[0]


def test_bigram_coherence_max_vocab_floor(_ray):
    # max_vocab=1 keeps only the most frequent unigram/bigram; unseen
    # probes floor at count 1 -> still well-defined, deterministic
    df = _coherence([(1, "a b a b"), (2, "c d")], max_vocab=1)
    assert df["n_bigrams"].tolist() == [3, 1]
    assert np.isfinite(df["coherence"]).all()


# ---------------------------------------------------------------------------
# SemDeDup
# ---------------------------------------------------------------------------


def _emb_ds(vecs):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(list(range(len(vecs))), pa.int64()),
                "embedding": pa.array(
                    [list(map(float, v)) for v in vecs],
                    pa.list_(pa.float64()),
                ),
            }
        )
    )


def test_semdedup_drops_within_cluster_dup(_ray):
    from exactextractr_ray.stages.knn import semdedup

    vecs = [
        [1, 0, 0],      # centroid 0
        [0, 1, 0],      # centroid 1
        [0.9, 0.1, 0],  # cluster 0, cos vs id0 ~0.994 -> dropped
        [0, 0.9, 0.2],  # cluster 1, cos vs id1 ~0.976 -> dropped
        [0.1, 0.1, 1],  # cluster 0 or 1 but far from both members -> kept
    ]
    df = (
        semdedup(_emb_ds(vecs), k_clusters=2, threshold=0.95)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert df["keep"].tolist() == [True, True, False, False, True]
    assert df.loc[0, "cluster_id"] == 0 and df.loc[1, "cluster_id"] == 1
    assert df.loc[2, "cluster_id"] == 0 and df.loc[3, "cluster_id"] == 1


def test_semdedup_cross_cluster_dup_survives(_ray):
    # SemDeDup only compares WITHIN a cluster: near-identical vectors in
    # different clusters both survive (the documented approximation)
    from exactextractr_ray.stages.knn import semdedup

    vecs = [
        [1, 0],        # centroid 0
        [0, 1],        # centroid 1
        [0.71, 0.712],  # ~45 deg -> cluster 1 (slightly closer)
        [0.712, 0.71],  # ~45 deg -> cluster 0; cos(2,3) ~ 1.0 but kept
    ]
    df = (
        semdedup(_emb_ds(vecs), k_clusters=2, threshold=0.99)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert df["keep"].all()
    assert df.loc[2, "cluster_id"] != df.loc[3, "cluster_id"]


def test_semdedup_parallelism_invariant(_ray):
    from exactextractr_ray.stages.knn import semdedup

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(60, 8))
    vecs[30] = vecs[5] * 1.5   # scaled copy -> cosine 1 with id 5
    a = (
        semdedup(_emb_ds(vecs), k_clusters=4, threshold=0.9)
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    )
    b = (
        semdedup(_emb_ds(vecs).repartition(9), k_clusters=4, threshold=0.9)
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    assert not a.loc[30, "keep"] and a.loc[5, "keep"]


def test_normalize_text_rules(_ray):
    import ray.data
    from exactextractr_ray.stages.text import normalize_text_batch

    texts = [
        "a  b\tc",          # run + tab
        "  lead and trail  ",
        "clean text",
        "x\r\n\ty",
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(
                    np.arange(len(texts), dtype=np.int64)
                ),
                "text": pa.array(texts, pa.string()),
            }
        )
    )
    df = (
        ds.map_batches(normalize_text_batch, batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
    )
    # \n is NOT in the control class (newlines are document structure);
    # \r and \t each become one space
    assert df["norm_text"].tolist() == [
        "a b c",
        "lead and trail",
        "clean text",
        "x \n y",
    ]
    assert df["n_changed"].tolist() == [1, 1, 0, 1]


def test_cooccurrence_pmi_counts(_ray):
    import ray.data
    from exactextractr_ray.stages.text import cooccurrence_pmi

    docs = ["a b", "a b", "a b c", "a c", "b", "a"]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.arange(len(docs), dtype=np.int64)),
                "text": pa.array(docs, pa.string()),
            }
        )
    ).repartition(3)
    df = (
        cooccurrence_pmi(ds, vocab_k=3, min_pair_count=1)
        .to_pandas()
        .sort_values(["tok_a", "tok_b"])
        .reset_index(drop=True)
    )
    got = {
        (r.tok_a, r.tok_b): (int(r.c_ab), r.pmi_ratio)
        for r in df.itertuples()
    }
    # df: a=5, b=4, c=2; pairs: (a,b)=3, (a,c)=2, (b,c)=1; N=6
    assert got[("a", "b")] == (3, (6 * 3) / (5 * 4))
    assert got[("a", "c")] == (2, (6 * 2) / (5 * 2))
    assert got[("b", "c")] == (1, (6 * 1) / (4 * 2))


def test_keyword_topk_values(_ray):
    import ray.data
    from exactextractr_ray.stages.text import keyword_topk

    docs = [
        "rare common common",     # rare df=1, common df=3
        "common unique1 unique1",
        "common other",
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.arange(3, dtype=np.int64)),
                "text": pa.array(docs, pa.string()),
            }
        )
    ).repartition(2)
    df = (
        keyword_topk(ds, m=2)
        .to_pandas()
        .sort_values(["doc_id", "rnk"])
        .reset_index(drop=True)
    )
    # doc 0: rare tf=1 df=1 -> 3.0; common tf=2 df=3 -> 2.0
    d0 = df[df["doc_id"] == 0]
    assert d0["term"].tolist() == ["rare", "common"]
    assert d0["score"].tolist() == [1 * (3 / 1.0), 2 * (3 / 3.0)]
    # doc 1: unique1 tf=2 df=1 -> 6.0 first
    d1 = df[df["doc_id"] == 1]
    assert d1["term"].tolist()[0] == "unique1"


def test_keyword_topk_vocab_cap(_ray):
    import ray.data
    from exactextractr_ray.stages.text import keyword_topk

    # cap=1 keeps only the highest-df token ('a'); docs with only other
    # tokens produce no rows
    docs = ["a b", "a c", "b c", "zzz"]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.arange(4, dtype=np.int64)),
                "text": pa.array(docs, pa.string()),
            }
        )
    )
    df = keyword_topk(ds, m=3, max_vocab=1).to_pandas()
    assert set(df["term"]) == {"a"}
    assert set(df["doc_id"]) == {0, 1}
