"""Count-min sketch (stages/cms.py) vs an in-process reference."""

import hashlib
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


@pytest.fixture
def _ray(ray_session):
    yield


def _ds(texts, parallelism=1):
    import ray.data

    ds = ray.data.from_arrow(
        pa.table({"text": pa.array(texts, pa.string())})
    )
    return ds.repartition(parallelism) if parallelism > 1 else ds


def _ref_cms(texts, d, w):
    cms = np.zeros((d, w), dtype=np.int64)
    cnt = Counter()
    for t in texts:
        cnt.update(t.split(" "))
    for tok, c in cnt.items():
        for row in range(d):
            h = int(hashlib.md5(f"{row}:{tok}".encode()).hexdigest()[:16], 16)
            cms[row, h % w] += c
    return cms, cnt


TEXTS = [
    "a b c a a",
    "b b d e a",
    "a c c f g h",
    "a a a b",
    "x y z x",
] * 6


def test_cms_build_matches_reference(_ray):
    from exactextractr_ray.stages.cms import cms_build

    got = cms_build(_ds(TEXTS, parallelism=4), d=3, w=8)
    exp, _ = _ref_cms(TEXTS, 3, 8)
    np.testing.assert_array_equal(got, exp)


def test_cms_overestimates_never_under(_ray):
    from exactextractr_ray.stages.cms import cms_heavy_hitters

    df = cms_heavy_hitters(_ds(TEXTS), d=3, w=8, denom=10**9).to_pandas()
    # denom huge -> threshold 0 -> every token reported
    _, cnt = _ref_cms(TEXTS, 3, 8)
    assert set(df["tk"]) == set(cnt)
    assert (df["est"] >= df["cnt"]).all()
    m = dict(zip(df["tk"], df["cnt"]))
    assert all(m[t] == c for t, c in cnt.items())


def test_cms_threshold_filters(_ray):
    from exactextractr_ray.stages.cms import cms_heavy_hitters

    # w large enough that there are no collisions: est == cnt exactly
    df = (
        cms_heavy_hitters(_ds(TEXTS), d=4, w=4096, denom=10)
        .to_pandas()
        .sort_values("tk")
        .reset_index(drop=True)
    )
    _, cnt = _ref_cms(TEXTS, 4, 4096)
    total = sum(cnt.values())
    exp = {t: c for t, c in cnt.items() if c >= total // 10}
    assert dict(zip(df["tk"], df["cnt"])) == exp
    assert (df["est"] == df["cnt"]).all()


def test_cms_parallelism_invariant(_ray):
    from exactextractr_ray.stages.cms import cms_heavy_hitters

    a = (
        cms_heavy_hitters(_ds(TEXTS), d=3, w=8, denom=50)
        .to_pandas()
        .sort_values("tk")
        .reset_index(drop=True)
    )
    b = (
        cms_heavy_hitters(_ds(TEXTS, parallelism=7), d=3, w=8, denom=50)
        .to_pandas()
        .sort_values("tk")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_hll_registers_and_estimate(ray_session):
    """HLL registers match a scalar reference; the estimate is within the
    standard error bound (~1.04/sqrt(m) ≈ 13% at m=64) of the true distinct
    count on a corpus with many duplicates."""
    import hashlib

    import numpy as np
    import pyarrow as pa
    import ray.data

    from exactextractr_ray.pipelines.sketch import (
        HLL_M,
        hll_estimate,
        hll_registers,
        hll_rho,
    )

    rng = np.random.default_rng(21)
    n = 4000
    vals = [f"value-{int(v)}" for v in rng.integers(0, 900, n)]  # ~900 distinct
    grp = [("a" if i % 3 else "b") for i in range(n)]
    ds = ray.data.from_arrow(
        pa.table({"source": pa.array(grp), "text": pa.array(vals)})
    ).repartition(8)
    out = hll_registers(ds, "source", "text").to_pandas()

    # scalar reference registers
    ref: dict[tuple[str, int], int] = {}
    for g, v in zip(grp, vals):
        h = np.array([int(hashlib.md5(v.encode()).hexdigest()[:16], 16)],
                     dtype=np.uint64)
        b, r = hll_rho(h)
        k = (g, int(b[0]))
        ref[k] = max(ref.get(k, 0), int(r[0]))
    got = {
        (row["source"], int(row["bucket"])): int(row["register"])
        for _, row in out.iterrows()
    }
    assert got == ref

    # estimator sanity per group
    for g in ("a", "b"):
        dense = np.zeros(HLL_M, dtype=np.int64)
        for (gg, b), r in ref.items():
            if gg == g:
                dense[b] = r
        true = len({v for v, gg in zip(vals, grp) if gg == g})
        est = hll_estimate(dense)
        # std error at m=64 is 1.04/sqrt(64) ~= 13% (measured over 20 seeds:
        # mean 0.0, std 0.133); bound at ~3 sigma
        assert abs(est - true) / true < 0.40, (g, est, true)
