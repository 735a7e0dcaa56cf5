"""Hypothesis property tests for the third-session operators — randomized
inputs against brute-force references (the depth the targeted fixtures
can't reach). Example counts kept small: each example spins Ray datasets."""

import numpy as np
import pyarrow as pa
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@st.composite
def _functional_graph(draw):
    """Random ACYCLIC pointer graph: every redirect points to a smaller
    node id (strictly decreasing chains terminate)."""
    n = draw(st.integers(min_value=1, max_value=40))
    targets = []
    for i in range(n):
        if i == 0 or draw(st.booleans()):
            targets.append(None)
        else:
            targets.append(draw(st.integers(min_value=0, max_value=i - 1)))
    return targets


@given(_functional_graph())
@settings(**_SETTINGS)
def test_resolve_pointers_random(ray_session, targets):
    from exactextractr_ray.stages.graph import resolve_pointers

    import ray.data

    n = len(targets)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "node": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
                "target": pa.array(
                    [None if t is None else int(t) for t in targets],
                    pa.int64(),
                ),
            }
        )
    ).repartition(3)
    df = (
        resolve_pointers(ds)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )

    def walk(i):
        hops = 0
        while targets[i] is not None:
            i = targets[i]
            hops += 1
        return i, hops

    for i in range(n):
        fin, hops = walk(i)
        assert df.loc[i, "final"] == fin
        assert df.loc[i, "hops"] == hops


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=8),
            st.integers(min_value=0, max_value=8),
        ),
        min_size=1,
        max_size=60,
    )
)
@settings(**_SETTINGS)
def test_pareto_front_random(ray_session, pts):
    from exactextractr_ray.stages.rank import pareto_front

    import ray.data

    price = np.array([p for p, _ in pts], dtype=np.float64)
    date = np.array([d for _, d in pts], dtype=np.float64)
    ids = np.arange(len(pts), dtype=np.int64)
    ds = ray.data.from_arrow(
        pa.table({"id": pa.array(ids), "p": pa.array(price),
                  "d": pa.array(date)})
    ).repartition(4)
    got = set(
        pareto_front(ds, max_col="p", min_col="d", id_col="id")
        .to_pandas()["id"]
    )
    expect = set()
    for i in range(len(pts)):
        dominated = any(
            price[j] >= price[i]
            and date[j] <= date[i]
            and (price[j] > price[i] or date[j] < date[i])
            for j in range(len(pts))
            if j != i
        )
        if not dominated:
            expect.add(int(ids[i]))
    assert got == expect


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=6),   # key
            st.integers(min_value=0, max_value=3),   # version
            st.integers(min_value=-99, max_value=99),  # payload
        ),
        min_size=0,
        max_size=30,
    ),
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=6),
            st.integers(min_value=0, max_value=3),
            st.integers(min_value=-99, max_value=99),
        ),
        min_size=0,
        max_size=30,
    ),
)
@settings(**_SETTINGS)
def test_upsert_merge_random(ray_session, base_rows, upd_rows):
    """Winner per key = lexicographic max of (version, side, appearance);
    within one side duplicates of a key are allowed here — the operator's
    pick must match pandas' idxmax on the same ordering."""
    from exactextractr_ray.stages.web import upsert_merge

    import pandas as pd
    import ray.data

    # dedupe within each side to the side-local winner first (the operator
    # contract: unique keys per input; emulate by pre-collapsing)
    def collapse(rows):
        if not rows:
            return []
        df = pd.DataFrame(rows, columns=["key", "version", "val"])
        df = df.sort_values(["key", "version", "val"], kind="mergesort")
        return list(
            df.groupby("key").last().reset_index().itertuples(index=False)
        )

    base_rows = collapse(base_rows)
    upd_rows = collapse(upd_rows)

    def mk(rows):
        k = [r[0] for r in rows]
        v = [r[1] for r in rows]
        val = [r[2] for r in rows]
        return ray.data.from_arrow(
            pa.table(
                {
                    "key": pa.array(np.asarray(k, np.int64), pa.int64()),
                    "version": pa.array(np.asarray(v, np.int64), pa.int64()),
                    "val": pa.array(np.asarray(val, np.int64), pa.int64()),
                }
            )
        ).repartition(3)

    out = upsert_merge(mk(base_rows), mk(upd_rows), key_col="key").to_pandas()
    if not base_rows and not upd_rows:
        assert len(out) == 0
        return
    out = out.sort_values("key").reset_index(drop=True)

    expect = {}
    for side, rows in ((0, base_rows), (1, upd_rows)):
        for k, v, val in rows:
            cur = expect.get(k)
            if cur is None or (v, side) > (cur[0], cur[1]):
                expect[k] = (v, side, val)
    assert list(out["key"]) == sorted(expect)
    for _, r in out.iterrows():
        v, _, val = expect[int(r["key"])]
        assert r["version"] == v and r["val"] == val
