"""Fixed-point k-means and BM25 retrieval."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


@pytest.fixture
def _ray(ray_session):
    yield


def _emb_ds(vecs, ids=None, nparts=3):
    import ray.data

    vecs = np.asarray(vecs, dtype=np.float32)
    ids = (
        np.arange(len(vecs), dtype=np.int64)
        if ids is None
        else np.asarray(ids, dtype=np.int64)
    )
    return ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array(
                    [list(map(float, v)) for v in vecs], pa.list_(pa.float32())
                ),
            }
        )
    ).repartition(nparts)


def test_kmeans_recovers_separated_clusters(_ray):
    from exactextractr_ray.stages.cluster import kmeans_fixed

    rng = np.random.default_rng(5)
    centers = np.array([[5.0, 0.0], [-5.0, 0.0], [0.0, 8.0]])
    vecs = np.concatenate(
        [c + rng.normal(0, 0.1, (30, 2)) for c in centers]
    )
    df = kmeans_fixed(_emb_ds(vecs), k=3, iters=5).to_pandas()
    df = df.sort_values("vec_id").reset_index(drop=True)
    lab = df["cluster_id"].to_numpy()
    # each true cluster maps to exactly one label
    for i in range(3):
        assert len(set(lab[i * 30 : (i + 1) * 30])) == 1
    assert len(set(lab[::30])) == 3


def test_kmeans_parallelism_invariant(_ray):
    from exactextractr_ray.stages.cluster import kmeans_fixed

    rng = np.random.default_rng(11)
    vecs = rng.normal(0, 1, (120, 8))

    def run(nparts):
        return (
            kmeans_fixed(_emb_ds(vecs, nparts=nparts), k=4, iters=3)
            .to_pandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )

    pd.testing.assert_frame_equal(run(2), run(11))


def test_kmeans_empty_cluster_keeps_centroid(_ray):
    from exactextractr_ray.stages.cluster import kmeans_fixed

    # two far-apart groups, k=3: one seed centroid (among the 3 smallest
    # vec_ids, all in group A) ends up empty after reassignment — the run
    # must not crash and must still produce a total assignment
    vecs = np.array(
        [[0.0, 0.0], [0.01, 0.0], [0.0, 0.01], [10.0, 10.0], [10.01, 10.0]]
    )
    df = kmeans_fixed(_emb_ds(vecs), k=3, iters=4).to_pandas()
    assert len(df) == 5
    assert set(df["cluster_id"]) <= {0, 1, 2}


def _docs_ds(texts):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(
                    np.arange(len(texts), dtype=np.int64), pa.int64()
                ),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).repartition(3)


def test_bm25_ranking_and_values(_ray):
    from exactextractr_ray.stages.text import bm25_topk

    texts = [
        "spark spark spark pad pad pad pad pad pad pad",  # high tf, long
        "spark",  # tf 1, very short doc -> length norm boosts it
        "join window",  # different terms
        "pad pad pad",  # no terms -> excluded
    ]
    out = (
        bm25_topk(_docs_ds(texts), ["spark", "join", "window"], k=10)
        .to_pandas()
        .sort_values(["score", "doc_id"], ascending=[False, True])
        .reset_index(drop=True)
    )
    assert set(out["doc_id"]) == {0, 1, 2}  # doc 3 has score 0

    # manual reference (same IEEE order)
    toklists = [t.split(" ") for t in texts]
    n = 4
    dl = np.array([len(t) for t in toklists], dtype=np.int64)
    avg = float(dl.sum()) / float(n)
    exp = np.zeros(n)
    for term in ["spark", "join", "window"]:
        df_ = sum(1 for t in toklists if term in set(t))
        idf = ((n - df_) + 0.5) / (df_ + 0.5)
        tf = np.array([t.count(term) for t in toklists], dtype=np.int64)
        exp = exp + idf * (tf * 2.2) / (
            tf + 1.2 * (0.25 + 0.75 * (dl / avg))
        )
    got = dict(zip(out["doc_id"], out["score"]))
    for d in (0, 1, 2):
        assert got[d] == exp[d]


def test_bm25_parallelism_invariant(_ray):
    from exactextractr_ray.stages.text import bm25_topk

    rng = np.random.default_rng(2)
    words = ["spark", "join", "window", "a", "b", "c", "d"]
    texts = [
        " ".join(rng.choice(words, size=rng.integers(3, 30)))
        for _ in range(100)
    ]

    def run(nparts):
        return (
            bm25_topk(
                _docs_ds(texts).repartition(nparts),
                ["spark", "join", "window"],
                k=15,
            )
            .to_pandas()
            .sort_values(["score", "doc_id"], ascending=[False, True])
            .reset_index(drop=True)
        )

    pd.testing.assert_frame_equal(run(2), run(9))


def test_hybrid_search_reranks(_ray):
    from exactextractr_ray.pipelines.search import hybrid_search

    df = hybrid_search(
        "/root/testdata/sf0.001", ["spark", "join", "window"], k=10,
        feedback=3,
    )
    assert len(df) == 10
    cos = df["cosine"].to_numpy()
    assert np.all(cos[:-1] >= cos[1:])  # sorted desc
    assert np.all(np.abs(cos) <= 1.0 + 1e-12)
    assert df["bm25"].min() > 0.0


def test_hybrid_search_missing_embeddings(_ray, tmp_path):
    """Candidates without embedding rows are dropped (sf0.1 regression:
    the embedding table covers only a prefix of doc_ids)."""
    from exactextractr_ray.pipelines.search import hybrid_search

    texts = [f"spark doc {i} filler words here" for i in range(6)]
    pa.parquet.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(6, dtype=np.int64)),
                "text": pa.array(texts, pa.string()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    rng = np.random.default_rng(3)
    pa.parquet.write_table(
        pa.table(
            {
                "vec_id": pa.array([0, 2, 4], pa.int64()),
                "embedding": pa.array(
                    [list(map(float, rng.normal(0, 1, 8))) for _ in range(3)],
                    pa.list_(pa.float32()),
                ),
            }
        ),
        tmp_path / "embeddings.parquet",
    )
    df = hybrid_search(str(tmp_path), ["spark"], k=6, feedback=3)
    assert sorted(df["doc_id"]) == [0, 2, 4]
    assert np.all(np.isfinite(df["cosine"]))

    # no embeddings at all -> empty with stable schema
    pa.parquet.write_table(
        pa.table(
            {
                "vec_id": pa.array([], pa.int64()),
                "embedding": pa.array([], pa.list_(pa.float32())),
            }
        ),
        tmp_path / "embeddings.parquet",
    )
    df2 = hybrid_search(str(tmp_path), ["spark"], k=6, feedback=3)
    assert len(df2) == 0
    assert list(df2.columns) == ["doc_id", "bm25", "cosine"]


def test_embedding_gram_matches_numpy(_ray):
    from exactextractr_ray.stages.cluster import _quantize, embedding_gram

    rng = np.random.default_rng(9)
    vecs = rng.normal(0, 0.3, (50, 6)).astype(np.float32)
    df = (
        embedding_gram(_emb_ds(vecs, nparts=4))
        .to_pandas()
        .sort_values(["i", "j"])
        .reset_index(drop=True)
    )
    q = _quantize(vecs.astype(np.float64))
    gram = q.T @ q
    for r in df.itertuples():
        if r.i == -2:
            assert r.v == 50
        elif r.i == -1:
            assert r.v == q[:, int(r.j)].sum()
        else:
            assert r.v == gram[int(r.i), int(r.j)]
    iu, ju = np.triu_indices(6)
    assert len(df) == len(iu) + 6 + 1


def test_linreg_fit_exact_vs_numpy(ray_session):
    """Integer Cramer fit == numpy lstsq to float tolerance, and the
    residual orthogonality X^T r = 0 holds exactly in rational form."""
    import ray.data

    from exactextractr_ray.stages.cluster import linreg_fit

    rng = np.random.default_rng(5)
    n = 400
    t = rng.integers(1, 200, n)
    u = rng.integers(1, 100, n)
    y = 3 * t + 7 * u + rng.integers(-5, 6, n)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "n_tokens": pa.array(t, pa.int64()),
                "n_unique": pa.array(u, pa.int64()),
                "n_chars": pa.array(y, pa.int64()),
            }
        )
    ).repartition(5)
    df = linreg_fit(ds, ["n_tokens", "n_unique"], "n_chars").to_pandas()
    X = np.column_stack([np.ones(n), t, u]).astype(float)
    beta = np.linalg.lstsq(X, y.astype(float), rcond=None)[0]
    got = np.array([df["coef_0"][0], df["coef_1"][0], df["coef_2"][0]])
    assert np.allclose(got, beta, rtol=1e-9)
    assert abs(got[1] - 3) < 0.2 and abs(got[2] - 7) < 0.3
    assert df["n"][0] == n


def test_linreg_fit_singular_matrix(ray_session):
    """Collinear features -> det 0 -> NaN coefficients, no crash."""
    import ray.data

    from exactextractr_ray.stages.cluster import linreg_fit

    n = 50
    t = np.arange(n, dtype=np.int64)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "n_tokens": pa.array(t, pa.int64()),
                "n_unique": pa.array(2 * t, pa.int64()),  # collinear
                "n_chars": pa.array(3 * t, pa.int64()),
            }
        )
    )
    df = linreg_fit(ds, ["n_tokens", "n_unique"], "n_chars").to_pandas()
    assert df["det_f"][0] == 0.0
    assert np.isnan(df["coef_0"][0])


def test_label_centroids_vs_numpy(ray_session):
    import ray.data

    from exactextractr_ray.stages.cluster import _SCALE, label_centroids

    rng = np.random.default_rng(2)
    n, d = 120, 8
    emb = rng.normal(size=(n, d)).astype(np.float32)
    lab = rng.integers(0, 4, n)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "label": pa.array(lab, pa.int64()),
                "embedding": pa.array(list(emb), pa.list_(pa.float32())),
            }
        )
    ).repartition(6)
    df = (
        label_centroids(ds)
        .to_pandas()
        .sort_values(["label", "dim"])
        .reset_index(drop=True)
    )
    q = np.floor(emb.astype(np.float64) * _SCALE + 0.5).astype(np.int64)
    for g in range(4):
        m = lab == g
        want_sum = q[m].sum(axis=0)
        sub = df[df["label"] == g]
        assert np.array_equal(sub["sum_q"].to_numpy(), want_sum)
        assert (sub["n"] == m.sum()).all()
        exp = want_sum.astype(np.float64) / float(m.sum() * _SCALE)
        assert np.array_equal(sub["centroid"].to_numpy(), exp)
