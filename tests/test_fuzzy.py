"""Fuzzy string matching: vectorized Levenshtein + lossless length
blocking."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


@pytest.fixture
def _ray(ray_session):
    yield


def _lev_ref(a, b):
    la, lb = len(a), len(b)
    d = [[0] * (lb + 1) for _ in range(la + 1)]
    for i in range(la + 1):
        d[i][0] = i
    for j in range(lb + 1):
        d[0][j] = j
    for i in range(1, la + 1):
        for j in range(1, lb + 1):
            d[i][j] = min(
                d[i - 1][j] + 1,
                d[i][j - 1] + 1,
                d[i - 1][j - 1] + (a[i - 1] != b[j - 1]),
            )
    return d[la][lb]


def test_levenshtein_block_property():
    from exactextractr_ray.stages.fuzzy import _levenshtein_block

    rng = np.random.default_rng(1)
    pairs = []
    for _ in range(300):
        la, lb = rng.integers(0, 14, 2)
        pairs.append(
            (
                "".join(rng.choice(list("abcde"), la)),
                "".join(rng.choice(list("abcde"), lb)),
            )
        )
    n, maxlen = len(pairs), 16
    ea = np.zeros((n, maxlen), np.int32)
    eb = np.zeros((n, maxlen), np.int32)
    al = np.zeros(n, np.int64)
    bl = np.zeros(n, np.int64)
    for i, (a, b) in enumerate(pairs):
        ea[i, : len(a)] = [ord(c) for c in a]
        al[i] = len(a)
        eb[i, : len(b)] = [ord(c) for c in b]
        bl[i] = len(b)
    got = _levenshtein_block(ea, eb, al, bl)
    exp = np.array([_lev_ref(a, b) for a, b in pairs])
    assert (got == exp).all()


def test_edit_distance_pairs_exhaustive(_ray):
    import ray.data
    from exactextractr_ray.stages.fuzzy import edit_distance_pairs

    rng = np.random.default_rng(2)
    vocab = list(
        {
            "".join(rng.choice(list("abc"), rng.integers(1, 8)))
            for _ in range(60)
        }
    )
    # duplicate rows: distinct phase must collapse them
    rows = [vocab[int(i)] for i in rng.integers(0, len(vocab), 400)]
    ds = ray.data.from_arrow(
        pa.table({"name": pa.array(rows, pa.string())})
    ).repartition(5)
    got = (
        edit_distance_pairs(ds, "name", max_dist=2)
        .to_pandas()
        .sort_values(["name_a", "name_b"])
        .reset_index(drop=True)
    )
    present = sorted(set(rows))
    exp = []
    for i in range(len(present)):
        for j in range(i + 1, len(present)):
            d = _lev_ref(present[i], present[j])
            if 1 <= d <= 2:
                exp.append((present[i], present[j], d))
    exp = pd.DataFrame(exp, columns=["name_a", "name_b", "dist"])
    exp["dist"] = exp["dist"].astype(np.int64)
    got["dist"] = got["dist"].astype(np.int64)
    pd.testing.assert_frame_equal(got, exp)


def test_edit_distance_pairs_parallelism_invariant(_ray):
    import ray.data
    from exactextractr_ray.stages.fuzzy import edit_distance_pairs

    names = [f"item{i}" for i in range(30)] + ["itemx", "item1y"]

    def run(nparts):
        ds = ray.data.from_arrow(
            pa.table({"name": pa.array(names, pa.string())})
        ).repartition(nparts)
        return (
            edit_distance_pairs(ds, "name", max_dist=1)
            .to_pandas()
            .sort_values(["name_a", "name_b"])
            .reset_index(drop=True)
        )

    pd.testing.assert_frame_equal(run(2), run(9))


def test_edit_distance_rejects_long_strings(_ray):
    import ray.data
    from exactextractr_ray.stages.fuzzy import edit_distance_pairs

    ds = ray.data.from_arrow(
        pa.table({"name": pa.array(["x" * 100], pa.string())})
    )
    with pytest.raises(Exception, match="max_len"):
        edit_distance_pairs(ds, "name", max_dist=1, max_len=64).to_pandas()
