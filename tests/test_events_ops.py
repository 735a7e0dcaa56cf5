"""Events-table analytics: retention cohorts, ordered funnels, and the
one-pass semi/anti order classification."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

_DAY_US = 86_400_000_000


@pytest.fixture
def _ray(ray_session):
    yield


def _events_ds(rows):
    """rows = [(user_id, day_float, event_type), ...] — day_float in days
    since epoch (fractions = time of day)."""
    import ray.data

    uid = [r[0] for r in rows]
    ts = [int(r[1] * _DAY_US) for r in rows]
    et = [r[2] for r in rows]
    return ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array(uid, pa.int64()),
                "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
                "event_type": pa.array(et, pa.string()),
            }
        )
    ).repartition(3)


def test_retention_basic(_ray):
    from exactextractr_ray.stages.events import retention_cohorts

    # user 1: first day 10, active 10, 11, 13; user 2: first day 10,
    # active 10 only; user 3: first day 11, active 11, 13
    rows = [
        (1, 10.1, "view"),
        (1, 10.7, "view"),  # same day: counted once
        (1, 11.2, "view"),
        (1, 13.9, "view"),
        (2, 10.5, "view"),
        (3, 11.1, "view"),
        (3, 13.2, "view"),
    ]
    df = retention_cohorts(_events_ds(rows)).to_pandas()
    df.columns = ["cohort_day", "day_offset", "n_users"]
    got = {
        (int(r.cohort_day), int(r.day_offset)): int(r.n_users)
        for r in df.itertuples()
    }
    assert got == {
        (10, 0): 2,
        (10, 1): 1,
        (10, 3): 1,
        (11, 0): 1,
        (11, 2): 1,
    }


def test_funnel_strict_order(_ray):
    from exactextractr_ray.stages.events import funnel_counts

    rows = [
        # user 1: full funnel in order
        (1, 1.0, "view"),
        (1, 1.1, "click"),
        (1, 1.2, "purchase"),
        # user 2: click BEFORE first view -> stops at view
        (2, 2.1, "click"),
        (2, 2.2, "view"),
        # user 3: view then purchase without click -> stops after view
        (3, 3.0, "view"),
        (3, 3.1, "purchase"),
        # user 4: never viewed -> not even step 1
        (4, 4.0, "purchase"),
        # user 5: out-of-order then recovered (view, click, view, purchase):
        # purchase counts (after first click)
        (5, 5.0, "view"),
        (5, 5.1, "click"),
        (5, 5.3, "purchase"),
    ]
    df = funnel_counts(_events_ds(rows)).to_pandas()
    df.columns = ["step", "step_name", "n_users"]
    got = dict(zip(df["step_name"], df["n_users"].astype(int)))
    assert got == {"view": 4, "click": 2, "purchase": 2}


def test_funnel_equal_ts_not_counted(_ray):
    from exactextractr_ray.stages.events import funnel_counts

    rows = [(1, 1.0, "view"), (1, 1.0, "click")]
    df = funnel_counts(_events_ds(rows)).to_pandas()
    df.columns = ["step", "step_name", "n_users"]
    got = dict(zip(df["step_name"], df["n_users"].astype(int)))
    assert got == {"view": 1, "click": 0, "purchase": 0}


def test_retention_parallelism_invariant(_ray):
    from exactextractr_ray.stages.events import retention_cohorts

    rng = np.random.default_rng(3)
    rows = [
        (int(rng.integers(0, 20)), float(rng.uniform(0, 15)), "view")
        for _ in range(300)
    ]

    def run(nparts):
        ds = _events_ds(rows).repartition(nparts)
        df = retention_cohorts(ds).to_pandas()
        df.columns = ["cohort_day", "day_offset", "n_users"]
        return (
            df.sort_values(["cohort_day", "day_offset"])
            .reset_index(drop=True)
            .astype(np.int64)
        )

    pd.testing.assert_frame_equal(run(2), run(13))


def test_orders_return_split_matches_pandas(_ray, tmp_path):
    from exactextractr_ray.pipelines.relational import orders_return_split

    rng = np.random.default_rng(7)
    n_orders = 200
    okey = np.arange(n_orders, dtype=np.int64)
    prio = np.array([f"P{i%3}" for i in range(n_orders)])
    price = np.round(rng.uniform(10, 500, n_orders), 2)
    pa.parquet.write_table(
        pa.table(
            {
                "o_orderkey": okey,
                "o_orderpriority": prio,
                "o_totalprice": price,
            }
        ),
        tmp_path / "orders.parquet",
    )
    li_ok = rng.integers(0, n_orders, 600).astype(np.int64)
    flags = rng.choice(["N", "R", "A"], 600, p=[0.6, 0.2, 0.2])
    pa.parquet.write_table(
        pa.table({"l_orderkey": li_ok, "l_returnflag": flags}),
        tmp_path / "lineitem.parquet",
    )

    df = orders_return_split(str(tmp_path)).to_pandas()
    df = df.sort_values(["o_orderpriority", "has_return"]).reset_index(
        drop=True
    )

    ret = set(li_ok[flags == "R"].tolist())
    exp = (
        pd.DataFrame(
            {
                "o_orderpriority": prio,
                "has_return": np.array(
                    [1 if k in ret else 0 for k in okey], dtype=np.int64
                ),
                "n_orders": np.ones(n_orders, dtype=np.int64),
                "total_cents": np.round(price * 100).astype(np.int64),
            }
        )
        .groupby(["o_orderpriority", "has_return"], as_index=False)
        .sum()
    )
    exp = exp.sort_values(["o_orderpriority", "has_return"]).reset_index(
        drop=True
    )
    for c in ("has_return", "n_orders", "total_cents"):
        df[c] = df[c].astype(np.int64)
    pd.testing.assert_frame_equal(df, exp)


def test_event_gaps_values(_ray):
    from exactextractr_ray.stages.events import event_gaps

    import ray.data

    rows = [
        (1, 100, 1),
        (1, 250, 2),
        (1, 400, 3),  # gaps 150, 150
        (2, 50, 4),  # single event -> omitted
        (3, 10, 6),
        (3, 10, 5),  # same ts: order by event_id -> gap 0
        (3, 30, 7),
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "event_id": pa.array([r[2] for r in rows], pa.int64()),
            }
        )
    ).repartition(3)
    df = event_gaps(ds).to_pandas().sort_values("user_id")
    assert df["user_id"].tolist() == [1, 3]
    assert df["n_gaps"].tolist() == [2, 2]
    assert df["sum_gap_us"].tolist() == [300, 20]
    assert df["max_gap_us"].tolist() == [150, 20]
    assert df["min_gap_us"].tolist() == [150, 0]


def test_new_op_error_contracts(_ray):
    import ray.data
    from exactextractr_ray.stages.cluster import kmeans_fixed
    from exactextractr_ray.stages.events import funnel_counts
    from exactextractr_ray.stages.rank import quantile_gate
    from exactextractr_ray.stages.shuffle import sample_exact_k
    from exactextractr_ray.stages.text import bm25_topk

    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([0, 1], pa.int64())})
    )
    with pytest.raises(ValueError, match="at least one step"):
        funnel_counts(ds, steps=())
    with pytest.raises(ValueError, match="distinct"):
        funnel_counts(ds, steps=("view", "view"))
    with pytest.raises(ValueError, match="k must be"):
        kmeans_fixed(ds, k=0)
    with pytest.raises(ValueError, match="iters"):
        kmeans_fixed(ds, k=2, iters=-1)
    with pytest.raises(ValueError, match="q must be"):
        quantile_gate(ds, "doc_id", q=1.5)
    with pytest.raises(ValueError, match="keep must be"):
        quantile_gate(ds, "doc_id", keep="gt")
    with pytest.raises(ValueError, match="k must be"):
        sample_exact_k(ds, k=0)
    with pytest.raises(ValueError, match="query term"):
        bm25_topk(ds, [])


def test_kmeans_k_exceeds_corpus(_ray):
    import ray.data
    from exactextractr_ray.stages.cluster import kmeans_fixed

    ds = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array([0, 1], pa.int64()),
                "embedding": pa.array(
                    [[0.1, 0.2], [0.3, 0.4]], pa.list_(pa.float32())
                ),
            }
        )
    )
    with pytest.raises(ValueError, match="only 2 vectors"):
        kmeans_fixed(ds, k=5, iters=1)


def test_retention_and_gaps_hot_user(_ray):
    """One user with 80% of all events: the coarse-group design must not
    change results (hot user lands in one group, bounded by its own
    history)."""
    import ray.data
    from exactextractr_ray.stages.events import event_gaps, retention_cohorts

    rng = np.random.default_rng(6)
    rows = []
    eid = 0
    for _ in range(400):
        rows.append((7, float(rng.uniform(0, 10)), eid)); eid += 1
    for _ in range(100):
        rows.append((int(rng.integers(100, 120)), float(rng.uniform(0, 10)), eid)); eid += 1
    ds = ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array(
                    [int(r[1] * _DAY_US) for r in rows], pa.int64()
                ).cast(pa.timestamp("us")),
                "event_id": pa.array([r[2] for r in rows], pa.int64()),
            }
        )
    )

    def run_gaps(nparts):
        return (
            event_gaps(ds.repartition(nparts))
            .to_pandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )

    pd.testing.assert_frame_equal(run_gaps(2), run_gaps(17))

    def run_ret(nparts):
        df = retention_cohorts(ds.repartition(nparts)).to_pandas()
        df.columns = ["cohort_day", "day_offset", "n_users"]
        return (
            df.sort_values(["cohort_day", "day_offset"])
            .reset_index(drop=True)
            .astype(np.int64)
        )

    pd.testing.assert_frame_equal(run_ret(2), run_ret(17))


def test_event_transitions_counts(_ray):
    import ray.data
    from exactextractr_ray.stages.events import event_transitions

    rows = [  # (user, ts, eid, type)
        (1, 10, 1, "view"),
        (1, 20, 2, "click"),
        (1, 30, 3, "view"),
        (2, 10, 4, "view"),
        (2, 20, 5, "click"),
        (3, 5, 6, "purchase"),  # single event: no transition
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "event_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
            }
        )
    ).repartition(3)
    df = event_transitions(ds).to_pandas()
    df.columns = ["prev_type", "next_type", "n"]
    got = {
        (r.prev_type, r.next_type): int(r.n) for r in df.itertuples()
    }
    assert got == {("view", "click"): 2, ("click", "view"): 1}


def test_new_ops_empty_inputs(_ray):
    """Every round-3 operator must survive an empty (0-row) dataset —
    empty partitions are routine at scale and Ray's empty to_pandas drops
    columns (repo-wide gotcha)."""
    import ray.data
    from exactextractr_ray.stages.cluster import embedding_gram
    from exactextractr_ray.stages.events import (
        event_gaps,
        event_transitions,
        funnel_counts,
        retention_cohorts,
    )
    from exactextractr_ray.stages.rank import (
        grouped_running_total,
        percent_rank,
    )
    from exactextractr_ray.stages.text import (
        cooccurrence_pmi,
        keyword_topk,
        normalize_text_batch,
    )

    ev = ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "ts": pa.array([], pa.timestamp("us")),
                "event_id": pa.array([], pa.int64()),
                "event_type": pa.array([], pa.string()),
            }
        )
    )
    assert retention_cohorts(ev).count() == 0
    # empty input -> funnel groups are empty; per_group still emits its
    # fixed 3 step rows per coarse group seen, so just require no crash
    # and zero converted users
    fdf = funnel_counts(ev).to_pandas()
    assert len(fdf) == 0 or fdf.iloc[:, -1].sum() == 0
    assert event_gaps(ev).count() == 0
    assert event_transitions(ev).count() == 0

    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "text": pa.array([], pa.string()),
            }
        )
    )
    assert keyword_topk(docs).count() == 0
    assert cooccurrence_pmi(docs).count() == 0
    assert (
        docs.map_batches(normalize_text_batch, batch_format="pyarrow").count()
        == 0
    )

    nums = ray.data.from_arrow(
        pa.table(
            {
                "grp": pa.array([], pa.string()),
                "day": pa.array([], pa.int64()),
                "v": pa.array([], pa.int64()),
            }
        )
    )
    assert grouped_running_total(nums, "grp", "day", "v").count() == 0
    assert percent_rank(nums, "v").count() == 0

    emb = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array([], pa.int64()),
                "embedding": pa.array([], pa.list_(pa.float32())),
            }
        )
    )
    assert embedding_gram(emb).count() == 0


def test_moving_avg_matches_pandas(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from exactextractr_ray.stages.events import moving_avg

    rng = np.random.default_rng(11)
    n = 500
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 20, n),
            "ts": pd.to_datetime(rng.integers(0, 10**9, n), unit="us"),
            "value": rng.uniform(-50, 50, n),
        }
    )
    ds = ray.data.from_arrow(pa.Table.from_pandas(df)).repartition(7)
    got = (
        moving_avg(ds, window=3)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    # plain reference: per user, sorted by (ts, event_id), window of 3
    cents = np.floor(df["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
    want = np.empty(n, dtype=np.float64)
    for u in np.unique(df["user_id"]):
        sub = df[df["user_id"] == u].sort_values(["ts", "event_id"])
        idxs = sub.index.to_numpy()
        cs = cents[idxs]
        for j, global_i in enumerate(idxs):
            lo = max(0, j - 2)
            want[global_i] = (cs[lo : j + 1].sum() / 100.0) / (j + 1 - lo)
    assert np.array_equal(got["mavg"].to_numpy(), want)


def test_moving_avg_hot_user(ray_session):
    """One user owns 90% of events: still one group, exact result."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from exactextractr_ray.stages.events import moving_avg

    n = 1000
    uid = np.where(np.arange(n) % 10 == 0, np.arange(n) % 7 + 1, 0)
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": uid.astype(np.int64),
            "ts": pd.to_datetime(np.arange(n) * 1000, unit="us"),
            "value": np.ones(n) * 2.5,
        }
    )
    ds = ray.data.from_arrow(pa.Table.from_pandas(df)).repartition(4)
    got = moving_avg(ds, window=3).to_pandas()
    assert len(got) == n
    # constant values -> moving average equals the value everywhere
    assert np.allclose(got["mavg"].to_numpy(), 2.5)
