"""Round-3 operators: sequence packing, repetition gates, TF-IDF, domains."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _docs_ds(texts, repartition=None):
    import ray.data

    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )
    return ds.repartition(repartition) if repartition else ds


def _pack_reference(texts, budget):
    """Serial concat-and-chunk reference."""
    rows = []
    pos = 0
    for i, t in enumerate(texts):
        n = len([w for w in t.split(" ") if w])
        if n:
            for e in range(pos // budget, (pos + n - 1) // budget + 1):
                rows.append(
                    (
                        i,
                        e,
                        max(0, e * budget - pos),
                        min(n, (e + 1) * budget - pos),
                    )
                )
        pos += n
    return pd.DataFrame(
        rows, columns=["doc_id", "example_id", "tok_start", "tok_end"]
    )


def test_token_pack_matches_serial_reference(ray_session):
    from exactextractr_ray.stages.pack import pack_sequences

    rng = np.random.default_rng(3)
    texts = [
        " ".join(f"w{j}" for j in range(rng.integers(0, 23)))
        for _ in range(97)
    ]
    got = (
        pack_sequences(_docs_ds(texts), budget=16, num_buckets=7)
        .to_pandas()
        .sort_values(["doc_id", "example_id"])
        .reset_index(drop=True)
        .astype(np.int64)
    )
    exp = _pack_reference(texts, 16).astype(np.int64)
    pd.testing.assert_frame_equal(got, exp)
    # spans tile each doc exactly and respect the budget
    for d, g in got.groupby("doc_id"):
        assert g["tok_start"].iloc[0] == 0
        assert (g["tok_end"].to_numpy()[:-1] == g["tok_start"].to_numpy()[1:]).all()
        assert ((g["tok_end"] - g["tok_start"]) <= 16).all()
    # parallelism invariance: different block layout, identical output
    got2 = (
        pack_sequences(_docs_ds(texts, repartition=13), budget=16, num_buckets=4)
        .to_pandas()
        .sort_values(["doc_id", "example_id"])
        .reset_index(drop=True)
        .astype(np.int64)
    )
    pd.testing.assert_frame_equal(got2, exp)


def test_token_pack_validates_budget(ray_session):
    from exactextractr_ray.stages.pack import pack_sequences

    with pytest.raises(ValueError):
        pack_sequences(_docs_ds(["a b"]), budget=0)


def test_repetition_stats_known_values(ray_session):
    from exactextractr_ray.stages.text import repetition_stats_batch

    batch = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "a a a b",          # top 3/4; 2grams: aa,aa,ab -> dup 1/3
                    "x y z w",          # no repetition
                    "",                 # empty
                    "q",                # single token, no 2grams
                ],
                pa.string(),
            ),
        }
    )
    out = repetition_stats_batch(batch).to_pandas()
    assert out["n_words"].tolist() == [4, 4, 0, 1]
    np.testing.assert_allclose(
        out["top_word_frac"], [0.75, 0.25, 0.0, 1.0]
    )
    np.testing.assert_allclose(
        out["dup_2gram_frac"], [1 / 3, 0.0, 0.0, 0.0]
    )
    assert out["keep"].tolist() == [False, True, True, False]


def test_tfidf_topk_reference(ray_session):
    from exactextractr_ray.stages.text import tfidf_topk

    texts = [
        "spark join spark",   # tf spark=2, join=1
        "join window",        # join=1, window=1
        "window window",      # window=2
        "other words only",
        "spark",              # spark=1
    ]
    out = (
        tfidf_topk(_docs_ds(texts, repartition=3), ["spark", "join", "window"], k=3)
        .to_pandas()
        .reset_index(drop=True)
    )
    n = 5
    w = {"spark": n / 2, "join": n / 2, "window": n / 2}
    exp_scores = {
        0: 2 * w["spark"] + 1 * w["join"],
        1: 1 * w["join"] + 1 * w["window"],
        2: 2 * w["window"],
        4: 1 * w["spark"],
    }
    top = sorted(exp_scores.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    assert out["doc_id"].tolist() == [d for d, _ in top]
    np.testing.assert_allclose(out["score"], [s for _, s in top])


def test_domain_stats_parse_and_agg(ray_session):
    import ray.data

    from exactextractr_ray.stages.web import domain_stats, extract_domain_batch

    tbl = pa.table(
        {
            "url": pa.array(
                [
                    "https://a.example/x",
                    "https://a.example/y/z",
                    "http://b.example:8080/",
                    "https://c.example",  # no path
                ],
                pa.string(),
            ),
            "text": pa.array(["aa", "bbb", "c", ""], pa.string()),
        }
    )
    doms = extract_domain_batch(tbl).column("domain").to_pylist()
    assert doms == ["a.example", "a.example", "b.example:8080", "c.example"]
    out = (
        domain_stats(ray.data.from_arrow(tbl).repartition(2))
        .to_pandas()
        .sort_values("domain")
        .reset_index(drop=True)
    )
    assert out["domain"].tolist() == ["a.example", "b.example:8080", "c.example"]
    assert out["n_pages"].tolist() == [2, 1, 1]
    assert out["total_chars"].tolist() == [5, 1, 0]


def test_anchor_text_topk(ray_session):
    """Anchor parsing + top-k: tokens follow the anchor rule; the
    most-frequent token per href is the duplicated dst string when
    dst % 97 == dst... (both tokens coincide); counts equal inlink
    multiplicity; rnk respects (cnt DESC, token ASC)."""
    import numpy as np

    from exactextractr_ray.sources.pages import (
        anchor_text_for,
        page_link_targets,
        page_url,
        read_anchored_pages,
    )
    from exactextractr_ray.stages.web import anchor_text_topk

    sf = "/root/testdata/sf0.001"
    pages = read_anchored_pages(sf)
    df = anchor_text_topk(pages, k=3).to_pandas()
    assert set(df.columns) == {"href", "token", "cnt", "rnk"}
    assert df["rnk"].between(1, 3).all()

    # brute force from the rule
    import duckdb

    ids = (
        duckdb.connect()
        .execute(f"SELECT doc_id FROM read_parquet('{sf}/documents.parquet')")
        .df()["doc_id"]
        .to_numpy()
    )
    n = len(ids)
    src, dst = page_link_targets(np.sort(ids), n)
    from collections import Counter

    want = Counter()
    for d in dst:
        for tok in anchor_text_for(int(d)).split(" "):
            want[(page_url(int(d)), tok)] += 1
    got = {(r.href, r.token): int(r.cnt) for r in df.itertuples()}
    for key, cnt in got.items():
        assert want[key] == cnt, key
    # ranks consistent within href
    for href, sub in df.groupby("href"):
        sub = sub.sort_values("rnk")
        keys = list(zip(-sub["cnt"], sub["token"]))
        assert keys == sorted(keys), href
