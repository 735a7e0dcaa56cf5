"""sample_exact_k (deterministic order-statistics sample) and
quantile_gate (global-quantile quality filter)."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


@pytest.fixture
def _ray(ray_session):
    yield


def _ids_ds(n, nparts=4):
    import ray.data

    return ray.data.from_arrow(
        pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64))})
    ).repartition(nparts)


def test_sample_exact_k_matches_bruteforce(_ray):
    from exactextractr_ray.stages.shuffle import sample_exact_k

    n, k = 200, 17
    df = sample_exact_k(_ids_ds(n), k=k, salt="s9").to_pandas()
    assert len(df) == k
    exp = sorted(
        (hashlib.md5(f"s9:{i}".encode()).hexdigest(), i) for i in range(n)
    )[:k]
    got = list(zip(df["h"], df["doc_id"].astype(int)))
    assert sorted(got) == exp


def test_sample_exact_k_parallelism_invariant(_ray):
    from exactextractr_ray.stages.shuffle import sample_exact_k

    def run(nparts):
        return (
            sample_exact_k(_ids_ds(300, nparts), k=25)
            .to_pandas()
            .sort_values("h")
            .reset_index(drop=True)
        )

    pd.testing.assert_frame_equal(run(2), run(11))


def test_sample_exact_k_small_corpus(_ray):
    from exactextractr_ray.stages.shuffle import sample_exact_k

    df = sample_exact_k(_ids_ds(5), k=50).to_pandas()
    assert len(df) == 5  # k > n returns everything


def test_quantile_gate_ge_le(_ray):
    import ray.data
    from exactextractr_ray.stages.rank import quantile_gate

    rng = np.random.default_rng(4)
    vals = rng.integers(0, 1000, 400).astype(np.int64)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.arange(400, dtype=np.int64)),
                "score": pa.array(vals),
            }
        )
    ).repartition(5)

    thr = np.quantile(vals, 0.25)  # numpy 'linear' == q*(n-1) interpolation
    kept = quantile_gate(ds, "score", q=0.25, keep="ge").to_pandas()
    exp = set(np.flatnonzero(vals >= thr).tolist())
    assert set(kept["doc_id"]) == exp

    low = quantile_gate(ds, "score", q=0.25, keep="le").to_pandas()
    assert set(low["doc_id"]) == set(np.flatnonzero(vals <= thr).tolist())


def test_stratified_exact_k_per_group(_ray):
    import ray.data
    from exactextractr_ray.stages.shuffle import stratified_exact_k

    n = 120
    src = np.array([f"s{i % 3}" for i in range(n)])
    ds = ray.data.from_arrow(
        pa.table(
            {
                "source": pa.array(src),
                "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            }
        )
    ).repartition(5)
    df = stratified_exact_k(ds, "source", k=7).to_pandas()
    assert df.groupby("source").size().tolist() == [7, 7, 7]
    # within a group, rows are the k smallest hashes
    exp = sorted(
        (hashlib.md5(f"sample:{i}".encode()).hexdigest(), i)
        for i in range(0, n, 3)
    )[:7]
    g0 = df[df["source"] == "s0"].sort_values("rnk")
    assert list(zip(g0["h"], g0["doc_id"].astype(int))) == exp


def test_percent_rank_matches_scipy_style(_ray):
    import ray.data
    from exactextractr_ray.stages.rank import percent_rank

    vals = np.array([10, 20, 20, 30, 40], dtype=np.int64)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.arange(5, dtype=np.int64)),
                "v": pa.array(vals),
            }
        )
    ).repartition(2)
    df = percent_rank(ds, "v").to_pandas().sort_values("doc_id")
    # ranks: 1, 2, 2, 4, 5 -> pr = 0, .25, .25, .75, 1
    assert df["pr"].tolist() == [0.0, 0.25, 0.25, 0.75, 1.0]


def test_percent_rank_single_row(_ray):
    import ray.data
    from exactextractr_ray.stages.rank import percent_rank

    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([0], pa.int64()),
                  "v": pa.array([7], pa.int64())})
    )
    df = percent_rank(ds, "v").to_pandas()
    assert df["pr"].tolist() == [0.0]


def test_group_pearson_matches_numpy(_ray):
    import ray.data
    from exactextractr_ray.stages.rank import group_pearson

    rng = np.random.default_rng(8)
    n = 500
    g = np.array([f"g{i % 3}" for i in range(n)])
    x = np.round(rng.uniform(1, 50, n), 2)
    y = np.round(x * 3.0 + rng.normal(0, 5, n), 2)
    ds = ray.data.from_arrow(
        pa.table({"grp": pa.array(g), "x": pa.array(x), "y": pa.array(y)})
    ).repartition(7)
    df = group_pearson(ds, "grp", "x", "y")
    for gi in ("g0", "g1", "g2"):
        m = g == gi
        xi = np.round(x[m] * 100).astype(object)  # python ints via object
        yi = np.round(y[m] * 100).astype(object)
        xi = np.array([int(v) for v in xi], dtype=object)
        yi = np.array([int(v) for v in yi], dtype=object)
        nn = int(m.sum())
        sx, sy = sum(xi), sum(yi)
        sxx = sum(a * a for a in xi)
        syy = sum(b * b for b in yi)
        sxy = sum(a * b for a, b in zip(xi, yi))
        exp = float(nn * sxy - sx * sy) / (
            np.sqrt(float(nn * sxx - sx * sx))
            * np.sqrt(float(nn * syy - sy * sy))
        )
        got = float(df.loc[df["grp"] == gi, "r"].iloc[0])
        assert got == exp
        # sanity: strong positive correlation by construction
        assert got > 0.9


def test_group_pearson_zero_variance_nan(_ray):
    import ray.data
    from exactextractr_ray.stages.rank import group_pearson

    ds = ray.data.from_arrow(
        pa.table(
            {
                "grp": pa.array(["a"] * 4),
                "x": pa.array([5.0, 5.0, 5.0, 5.0]),
                "y": pa.array([1.0, 2.0, 3.0, 4.0]),
            }
        )
    )
    df = group_pearson(ds, "grp", "x", "y")
    assert np.isnan(df["r"].iloc[0])


def test_group_pearson_parallelism_invariant(_ray):
    import ray.data
    from exactextractr_ray.stages.rank import group_pearson

    rng = np.random.default_rng(12)
    n = 300
    tbl = pa.table(
        {
            "grp": pa.array([f"s{i % 4}" for i in range(n)]),
            "x": pa.array(np.round(rng.uniform(0, 9, n), 2)),
            "y": pa.array(np.round(rng.uniform(0, 9, n), 2)),
        }
    )

    def run(nparts):
        ds = ray.data.from_arrow(tbl).repartition(nparts)
        return group_pearson(ds, "grp", "x", "y").reset_index(drop=True)

    pd.testing.assert_frame_equal(run(2), run(11))


def test_mad_outliers_flags(_ray):
    import ray.data
    from exactextractr_ray.stages.rank import mad_outliers

    vals = np.array([10.0] * 20 + [10.5] * 20 + [100.0, -50.0])
    ids = np.arange(len(vals), dtype=np.int64)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "event_id": pa.array(ids),
                "event_type": pa.array(["t"] * len(vals)),
                "value": pa.array(vals),
            }
        )
    ).repartition(3)
    out = mad_outliers(ds, "event_type", "value", k=3.0).to_pandas()
    assert sorted(out["event_id"]) == [40, 41]  # only the two wild points


def test_grouped_running_total(_ray):
    import ray.data
    from exactextractr_ray.stages.rank import grouped_running_total

    rows = [  # (grp, day, v)
        ("a", 3, 5), ("a", 1, 2), ("a", 1, 3), ("a", 2, 1),
        ("b", 1, 10), ("b", 5, 1),
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "grp": pa.array([r[0] for r in rows]),
                "day": pa.array([r[1] for r in rows], pa.int64()),
                "v": pa.array([r[2] for r in rows], pa.int64()),
            }
        )
    ).repartition(3)
    df = (
        grouped_running_total(ds, "grp", "day", "v")
        .to_pandas()
        .sort_values(["grp", "day"])
        .reset_index(drop=True)
    )
    assert df["grp"].tolist() == ["a", "a", "a", "b", "b"]
    assert df["day"].tolist() == [1, 2, 3, 1, 5]
    assert df["period_value"].tolist() == [5, 1, 5, 10, 1]
    assert df["running_total"].tolist() == [5, 6, 11, 10, 11]
