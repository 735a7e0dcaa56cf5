"""top_k_per_group (stages/rank.py) vs an in-process pandas window."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


@pytest.fixture
def _ray(ray_session):
    yield


def _mk(n=400, groups=11, seed=5):
    rng = np.random.default_rng(seed)
    df = pd.DataFrame(
        {
            "g": [f"g{int(x)}" for x in rng.integers(0, groups, n)],
            "v": rng.integers(0, 40, n).astype(np.int64),  # many ties
            "id": np.arange(n, dtype=np.int64),
        }
    )
    return df


def _expect(df, k, ascending=False):
    out = df.sort_values(
        ["g", "v", "id"], ascending=[True, ascending, True]
    ).copy()
    out["rnk"] = out.groupby("g").cumcount() + 1
    out = out[out["rnk"] <= k]
    return out.reset_index(drop=True)


def _run(df, k, ascending=False, parallelism=1, **kw):
    import ray.data

    from exactextractr_ray.stages.rank import top_k_per_group

    ds = ray.data.from_arrow(pa.Table.from_pandas(df))
    if parallelism > 1:
        ds = ds.repartition(parallelism)
    out = top_k_per_group(
        ds, "g", "v", k, tie_col="id", ascending=ascending, **kw
    ).to_pandas()
    return (
        out.sort_values(["g", "rnk"])
        .reset_index(drop=True)[["g", "v", "id", "rnk"]]
    )


def test_topk_matches_window(_ray):
    df = _mk()
    got = _run(df, 3)
    exp = _expect(df, 3)[["g", "v", "id", "rnk"]]
    pd.testing.assert_frame_equal(got, exp)


def test_topk_ascending(_ray):
    df = _mk(seed=9)
    got = _run(df, 2, ascending=True)
    exp = _expect(df, 2, ascending=True)[["g", "v", "id", "rnk"]]
    pd.testing.assert_frame_equal(got, exp)


def test_topk_k_exceeds_group_size(_ray):
    df = _mk(n=30, groups=10)
    got = _run(df, 50)
    exp = _expect(df, 50)[["g", "v", "id", "rnk"]]
    pd.testing.assert_frame_equal(got, exp)  # every row survives, ranked


def test_topk_parallelism_invariant(_ray):
    df = _mk(n=600, seed=2)
    a = _run(df, 4)
    b = _run(df, 4, parallelism=9, num_coarse_groups=5)
    pd.testing.assert_frame_equal(a, b)


def test_group_quantiles_matches_duckdb(_ray):
    import duckdb
    import ray.data

    from exactextractr_ray.stages.rank import group_quantiles

    df = _mk(n=500, groups=7, seed=13)
    ds = ray.data.from_arrow(pa.Table.from_pandas(df)).repartition(6)
    got = (
        group_quantiles(ds, "g", "v", qs=(0.25, 0.5, 0.75))
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)[["g", "q25", "q50", "q75"]]
    )
    con = duckdb.connect()
    con.register("t", df)
    exp = con.execute(
        """SELECT g, quantile_cont(v, 0.25) AS q25,
                  quantile_cont(v, 0.5) AS q50,
                  quantile_cont(v, 0.75) AS q75
           FROM t GROUP BY g ORDER BY g"""
    ).df()
    pd.testing.assert_frame_equal(got, exp, check_exact=True)


def test_group_quantiles_single_value_group(_ray):
    import ray.data

    from exactextractr_ray.stages.rank import group_quantiles

    df = pd.DataFrame(
        {"g": ["a", "a", "b"], "v": np.array([4, 8, 3], np.int64)}
    )
    got = (
        group_quantiles(ray.data.from_arrow(pa.Table.from_pandas(df)), "g", "v")
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    assert got.loc[0, "q50"] == 6.0
    assert got.loc[1, "q25"] == 3.0 and got.loc[1, "q75"] == 3.0


def test_topk_float_order_col(_ray):
    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {
            "g": [f"g{i%4}" for i in range(100)],
            "v": rng.normal(size=100),
            "id": np.arange(100, dtype=np.int64),
        }
    )
    got = _run(df, 3)
    exp = _expect(df, 3)[["g", "v", "id", "rnk"]]
    pd.testing.assert_frame_equal(got, exp)
