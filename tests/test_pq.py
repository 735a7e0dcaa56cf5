"""Product quantization (stages/knn.py PQ family): codebook determinism,
code re-derivation, exactness at full refine, and recall floors vs brute
force (Jegou et al. 2011 ADC with exact re-rank)."""

import numpy as np
import pytest


def _emb_ds(ray_session, n=300, dim=32, seed=11):
    import pyarrow as pa
    import ray

    rng = np.random.RandomState(seed)
    mat = rng.normal(size=(n, dim))
    return ray.data.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(list(mat), pa.list_(pa.float64())),
    })), mat


def test_train_pq_deterministic(ray_session):
    from exactextractr_ray.stages.knn import train_pq

    ds, _ = _emb_ds(ray_session)
    b1 = train_pq(ds, m=8, ks=16, seed=7)
    b2 = train_pq(ds, m=8, ks=16, seed=7)
    assert b1.shape == (8, 16, 4)
    np.testing.assert_array_equal(b1, b2)
    b3 = train_pq(ds, m=8, ks=16, seed=8)
    assert not np.array_equal(b1, b3)


def test_pq_encode_rederivation(ray_session):
    """Codes must re-derive as the argmin centroid per subspace on the
    normalized vector — checked independently of the encoder's expanded-
    form distance trick."""
    from exactextractr_ray.stages.knn import pq_encode, train_pq

    ds, mat = _emb_ds(ray_session, n=120, dim=16)
    books = train_pq(ds, m=4, ks=8)
    rows = {r["vec_id"]: r["code"] for r in pq_encode(ds, books).take_all()}
    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    m, ks, dsub = books.shape
    for vid in (0, 17, 63, 119):
        got = np.frombuffer(rows[vid], np.uint8)
        exp = [
            int(((norm[vid, i * dsub:(i + 1) * dsub] - books[i]) ** 2)
                .sum(axis=1).argmin())
            for i in range(m)
        ]
        assert list(got) == exp, vid


def test_pq_full_refine_equals_brute(ray_session):
    """refine*k >= corpus: candidate set is the whole corpus, so the
    exact re-rank must reproduce brute-force ids and ranks exactly."""
    from exactextractr_ray.stages.knn import knn_cosine, knn_cosine_pq

    ds, mat = _emb_ds(ray_session, n=200, dim=32)
    qids = np.arange(8, dtype=np.int64)
    qmat = mat[:8]
    cols = ["query_id", "neighbor_id", "rank"]
    base = (knn_cosine(ds, qids, qmat, k=10).to_pandas()
            .sort_values(["query_id", "rank"]).reset_index(drop=True))
    full = (knn_cosine_pq(ds, qids, qmat, k=10, m=8, ks=16, refine=32)
            .to_pandas()
            .sort_values(["query_id", "rank"]).reset_index(drop=True))
    assert base[cols].equals(full[cols])
    # sims agree to float noise (different but equivalent dot groupings)
    np.testing.assert_allclose(base["sim"], full["sim"], atol=1e-12)


def test_pq_recall_floor(ray_session):
    """Honest ANN settings keep a sane recall on random vectors (the
    hardest case — see tools/sweep_pq_recall.py for the full frontier)."""
    from exactextractr_ray.stages.knn import knn_cosine, knn_cosine_pq

    ds, mat = _emb_ds(ray_session, n=300, dim=32)
    qids = np.arange(12, dtype=np.int64)
    qmat = mat[:12]
    base = knn_cosine(ds, qids, qmat, k=10).to_pandas()
    got = knn_cosine_pq(
        ds, qids, qmat, k=10, m=16, ks=16, refine=4
    ).to_pandas()
    rec = np.mean([
        len(set(base[base.query_id == q].neighbor_id)
            & set(got[got.query_id == q].neighbor_id)) / 10
        for q in qids
    ])
    assert rec >= 0.5, rec


def test_pq_dim_validation(ray_session):
    from exactextractr_ray.stages.knn import train_pq

    ds, _ = _emb_ds(ray_session, n=50, dim=30)
    with pytest.raises(ValueError, match="not divisible"):
        train_pq(ds, m=8)
