"""Link-graph operators (stages/graph.py): fixed-point PageRank.

The reference engine has no graph side; this is part of the web-corpus
curation surface (document quality weighting over a crawl link graph).
Checked against an independent in-process numpy implementation of the same
integer iteration, plus structural invariants.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


@pytest.fixture
def _ray(ray_session):
    yield


def _edges_ds(pairs, parallelism=1):
    import ray.data

    src = [p[0] for p in pairs]
    dst = [p[1] for p in pairs]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
            }
        )
    )
    return ds.repartition(parallelism) if parallelism > 1 else ds


def _pagerank_numpy(pairs, n, iters=5, scale=10**12):
    """The same integer update rule, single-threaded numpy."""
    src = np.array([p[0] for p in pairs], dtype=np.int64)
    dst = np.array([p[1] for p in pairs], dtype=np.int64)
    outdeg = np.bincount(src, minlength=n).astype(np.int64)
    r = np.full(n, scale // n, dtype=np.int64)
    base = (15 * (scale // n)) // 100
    for _ in range(iters):
        contrib = r[src] // outdeg[src]
        s = np.bincount(dst, weights=None, minlength=n).astype(np.int64)
        s[:] = 0
        np.add.at(s, dst, contrib)
        r = base + (85 * s) // 100
    return r


def _run(pairs, n, iters=5, **kw):
    from exactextractr_ray.stages.graph import pagerank

    df = (
        pagerank(_edges_ds(pairs, **kw), n, iters=iters)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    return df


def test_pagerank_matches_numpy_reference(_ray):
    rng = np.random.default_rng(3)
    n = 40
    pairs = set()
    for _ in range(150):
        a, b = rng.integers(0, n, size=2)
        if a != b:
            pairs.add((int(a), int(b)))
    pairs = sorted(pairs)
    # make sure every node has at least one out-edge (no dangling leak in
    # the reference comparison)
    for i in range(n):
        if not any(p[0] == i for p in pairs):
            pairs.append((i, (i + 1) % n))
    df = _run(pairs, n)
    expect = _pagerank_numpy(pairs, n)
    assert df["node"].tolist() == list(range(n))
    np.testing.assert_array_equal(df["pr_int"].to_numpy(), expect)
    np.testing.assert_array_equal(
        df["pr"].to_numpy(), expect / float(10**12)
    )


def test_pagerank_star_sink_accumulates(_ray):
    # star: everyone points at node 0; node 0 points at node 1
    n = 6
    pairs = [(i, 0) for i in range(1, n)] + [(0, 1)]
    df = _run(pairs, n)
    pr = df["pr_int"].to_numpy()
    assert pr[0] == pr.max()           # the sink hub dominates
    assert pr[1] > pr[2]               # fed by the hub
    assert (pr[2:] == pr[2]).all()     # leaves identical by symmetry


def test_pagerank_no_in_edges_gets_base(_ray):
    n = 4
    scale = 10**12
    base = (15 * (scale // n)) // 100
    # node 3 has out-edges but NO in-edges
    pairs = [(0, 1), (1, 2), (2, 0), (3, 0)]
    df = _run(pairs, n)
    assert df.loc[3, "pr_int"] == base


def test_pagerank_parallelism_invariant(_ray):
    rng = np.random.default_rng(11)
    n = 50
    pairs = sorted(
        {
            (int(a), int(b))
            for a, b in rng.integers(0, n, size=(300, 2))
            if a != b
        }
    )
    a = _run(pairs, n)
    b = _run(pairs, n, parallelism=7)
    pd.testing.assert_frame_equal(a, b)


def test_degree_table(_ray):
    from exactextractr_ray.stages.graph import degree_table

    # node 3 isolated; node 0 hub
    pairs = [(0, 1), (0, 2), (1, 0), (2, 0), (4, 0)]
    df = (
        degree_table(_edges_ds(pairs), 5)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    assert df["node"].tolist() == [0, 1, 2, 3, 4]
    assert df["outdeg"].tolist() == [2, 1, 1, 0, 1]
    assert df["indeg"].tolist() == [3, 1, 1, 0, 0]


def test_out_degree(_ray):
    from exactextractr_ray.stages.graph import out_degree

    deg = (
        out_degree(_edges_ds([(0, 1), (0, 2), (2, 1)]))
        .to_pandas()
        .sort_values("src")
        .reset_index(drop=True)
    )
    assert deg["src"].tolist() == [0, 2]
    assert deg["outdeg"].tolist() == [2, 1]


def test_triangle_counts_bruteforce(ray_session):
    """Per-node triangle participation matches a set-based brute force on a
    random directed multigraph (duplicates + both directions present)."""
    import itertools

    import numpy as np
    import pyarrow as pa
    import ray.data

    from exactextractr_ray.stages.graph import triangle_counts

    rng = np.random.default_rng(9)
    n = 40
    src = rng.integers(0, n, 300)
    dst = rng.integers(0, n, 300)
    ds = ray.data.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
    ).repartition(5)
    got = triangle_counts(ds).to_pandas().set_index("node")["n_triangles"].to_dict()

    und = {(min(a, b), max(a, b)) for a, b in zip(src.tolist(), dst.tolist()) if a != b}
    want: dict[int, int] = {}
    for u, v, w in itertools.combinations(range(n), 3):
        if (u, v) in und and (v, w) in und and (u, w) in und:
            for x in (u, v, w):
                want[x] = want.get(x, 0) + 1
    assert got == want


def test_triangle_counts_empty(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from exactextractr_ray.stages.graph import triangle_counts

    ds = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([0, 1], pa.int64()),
                "dst": pa.array([1, 2], pa.int64()),  # a path: no triangle
            }
        )
    )
    assert triangle_counts(ds).count() == 0


def test_triangle_counts_hub_skew(ray_session):
    """A hub star (one low-ID node connected to everything) maximizes wedge
    fan-out under smallest-ID orientation; counts stay exact."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from exactextractr_ray.stages.graph import triangle_counts

    n = 200
    hub_src = np.zeros(n - 1, dtype=np.int64)
    hub_dst = np.arange(1, n, dtype=np.int64)
    # plus a chain 1-2, 2-3, ..., closing triangles (0, i, i+1)
    chain_src = np.arange(1, n - 1, dtype=np.int64)
    chain_dst = np.arange(2, n, dtype=np.int64)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array(np.concatenate([hub_src, chain_src]), pa.int64()),
                "dst": pa.array(np.concatenate([hub_dst, chain_dst]), pa.int64()),
            }
        )
    ).repartition(4)
    out = triangle_counts(ds).to_pandas().set_index("node")["n_triangles"]
    # triangles: (0, i, i+1) for i in 1..n-2 -> hub in all n-2 of them;
    # node 1 and n-1 in one each; middle chain nodes in two each
    assert out[0] == n - 2
    assert out[1] == 1 and out[n - 1] == 1
    assert (out.drop([0, 1, n - 1]) == 2).all()


def test_triangle_counts_large_node_ids(ray_session):
    """Regression (round-4 ADVICE): node ids >= 2^31 must not produce
    phantom triangles — the old (v << 31) + w pair key collided there.
    A triangle among huge ids plus a non-closing wedge whose shifted keys
    would alias."""
    import itertools

    import ray.data
    from exactextractr_ray.stages.graph import triangle_counts

    B = 2**31
    # one real triangle on huge ids + a pendant edge (no extra triangle)
    edges = [(B + 5, B + 9), (B + 9, 3 * B + 1), (B + 5, 3 * B + 1),
             (3 * B + 1, 7 * B + 2)]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([a for a, _ in edges], pa.int64()),
                "dst": pa.array([b for _, b in edges], pa.int64()),
            }
        )
    )
    got = triangle_counts(ds).to_pandas().set_index("node")["n_triangles"].to_dict()

    # set-based brute force
    und = set()
    for a, b in edges:
        und.add((min(a, b), max(a, b)))
    nodes = sorted({x for e in und for x in e})
    expected = {}
    for u, v, w in itertools.combinations(nodes, 3):
        if (u, v) in und and (v, w) in und and (u, w) in und:
            for x in (u, v, w):
                expected[x] = expected.get(x, 0) + 1
    assert got == expected
