"""Sessionization and tumbling-window operators over the events table."""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def _ray(ray_session):
    return None


def test_sessionize_gap_logic(_ray):
    import ray.data
    from exactextractr_ray.stages.sessions import sessionize

    base = np.datetime64("2024-01-01T00:00:00", "us")
    rows = []
    # user 1: events at 0s, 10s, 40min (new session), 41min
    for i, off in enumerate([0, 10, 2400, 2460]):
        rows.append(
            {"event_id": i, "user_id": 1, "ts": base + np.timedelta64(off, "s"),
             "event_type": "x", "value": 1.0}
        )
    # user 2: single event
    rows.append(
        {"event_id": 10, "user_id": 2, "ts": base, "event_type": "x", "value": 2.0}
    )
    df = pd.DataFrame(rows)
    out = sessionize(ray.data.from_pandas(df), gap_seconds=1800).to_pandas()
    u1 = out[out.user_id == 1].sort_values("session_seq")
    assert list(u1["n_events"]) == [2, 2]
    assert list(u1["session_seq"]) == [0, 1]
    assert u1["duration_us"].iloc[0] == 10_000_000
    assert len(out[out.user_id == 2]) == 1
    assert out[out.user_id == 2]["sum_value"].iloc[0] == 2.0


def test_tumbling_window_counts(_ray):
    import ray.data
    from exactextractr_ray.stages.sessions import tumbling_window

    ev = ray.data.read_parquet("/root/testdata/sf0.001/events.parquet")
    out = tumbling_window(ev, window_seconds=3600).to_pandas()
    assert out["n_events"].sum() == 1000
    # windows aligned to the hour
    assert (out["window_start"] % 3600 == 0).all()
    # invariant under repartitioning (partial-agg correctness)
    out2 = tumbling_window(ev.repartition(7), window_seconds=3600).to_pandas()
    a = out.sort_values(["window_start", "event_type"]).reset_index(drop=True)
    b = out2.sort_values(["window_start", "event_type"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a[["window_start", "event_type", "n_events"]],
                                  b[["window_start", "event_type", "n_events"]])


def test_morton_cell_hierarchy():
    from exactextractr_ray.stages.geocode import morton_cell

    rng = np.random.default_rng(9)
    lon = rng.uniform(-180, 180, 500)
    lat = rng.uniform(-90, 90, 500)
    c12 = morton_cell(lon, lat, 12)
    c11 = morton_cell(lon, lat, 11)
    c8 = morton_cell(lon, lat, 8)
    # prefix-truncation hierarchy: parent id = child id >> 2
    assert np.array_equal(c12 >> 2, c11)
    assert np.array_equal(c12 >> 8, c8)
    assert c12.min() >= 0 and c12.max() < (1 << 24)


def test_sessionize_hot_user_split(_ray):
    """One user owning 50% of events, with sessions spanning day boundaries:
    the (user, day) split + stitch must agree with a single-pass reference
    sessionization of the full event list."""
    import ray.data
    from exactextractr_ray.stages.sessions import sessionize

    rng = np.random.default_rng(9)
    gap_us = 1800 * 1_000_000
    day_us = 86_400_000_000
    rows = []
    eid = 0
    # hot user 7: bursts every ~20 min for 6 days (sessions cross midnight),
    # plus explicit events straddling a midnight with a small gap
    t = 1_700_000_000_000_000
    for k in range(5000):
        t += int(rng.integers(1, 40)) * 60 * 1_000_000  # 1..39 min gaps
        rows.append((eid, t, 7, "view", 1.0)); eid += 1
    # events 90 s on each side of a midnight boundary
    mid = (t // day_us + 2) * day_us
    rows.append((eid, mid - 90_000_000, 7, "view", 1.0)); eid += 1
    rows.append((eid, mid + 90_000_000, 7, "view", 1.0)); eid += 1
    # cold users
    for u in range(20):
        tu = 1_700_000_000_000_000 + u * 7_000_000_000
        for k in range(250):
            tu += int(rng.integers(1, 50)) * 60 * 1_000_000
            rows.append((eid, tu, 100 + u, "view", 0.5)); eid += 1
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value"])
    df["ts"] = df["ts"].astype("datetime64[us]")

    out = sessionize(ray.data.from_pandas(df), gap_seconds=1800).to_pandas()
    out = out.sort_values(["user_id", "session_seq"]).reset_index(drop=True)

    # single-pass reference
    exp_rows = []
    for u, g in df.groupby("user_id"):
        ts = np.sort(g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64))
        brk = np.r_[True, np.diff(ts) > gap_us]
        sid = np.cumsum(brk) - 1
        for s in range(sid.max() + 1):
            m = sid == s
            exp_rows.append((int(u), s, int(m.sum()), int(ts[m].min()), int(ts[m].max())))
    exp = pd.DataFrame(
        exp_rows, columns=["user_id", "session_seq", "n_events", "start_us", "end_us"]
    ).sort_values(["user_id", "session_seq"]).reset_index(drop=True)

    got = out[["user_id", "session_seq", "n_events", "start_us", "end_us"]].astype(np.int64)
    pd.testing.assert_frame_equal(got, exp.astype(np.int64))
    # the midnight-straddling pair landed in ONE session
    hot = out[out.user_id == 7]
    assert ((hot["start_us"] <= mid - 90_000_000) & (hot["end_us"] >= mid + 90_000_000)).any()


def test_asof_join_matches_pandas(_ray):
    """asof_join vs pandas merge_asof per user on synthetic streams."""
    import ray.data
    from exactextractr_ray.stages.sessions import asof_join

    rng = np.random.default_rng(3)
    n_l, n_r = 400, 300
    left = pd.DataFrame(
        {
            "event_id": np.arange(n_l),
            "user_id": rng.integers(0, 12, n_l),
            "ts": (1_700_000_000_000_000 + rng.integers(0, 10**9, n_l)).astype(
                "datetime64[us]"
            ),
            "value": rng.normal(size=n_l),
        }
    )
    right = pd.DataFrame(
        {
            "event_id": np.arange(1000, 1000 + n_r),
            "user_id": rng.integers(0, 12, n_r),
            "ts": (1_700_000_000_000_000 + rng.integers(0, 10**9, n_r)).astype(
                "datetime64[us]"
            ),
            "value": rng.normal(size=n_r),
        }
    )
    got = asof_join(
        ray.data.from_pandas(left), ray.data.from_pandas(right),
        value_cols=("event_id", "value"),
    ).to_pandas().sort_values("event_id").reset_index(drop=True)

    exp = pd.merge_asof(
        left.sort_values("ts"),
        right.sort_values("ts").rename(
            columns={"event_id": "event_id_r", "value": "value_r"}
        )[["user_id", "ts", "event_id_r", "value_r"]],
        on="ts", by="user_id", direction="backward",
    ).sort_values("event_id").reset_index(drop=True)

    assert len(got) == n_l
    np.testing.assert_array_equal(
        got["event_id"].to_numpy(), exp["event_id"].to_numpy()
    )
    np.testing.assert_array_equal(
        np.nan_to_num(got["event_id_r"].to_numpy(), nan=-1),
        np.nan_to_num(exp["event_id_r"].to_numpy(dtype=np.float64), nan=-1),
    )
    np.testing.assert_allclose(
        got["value_r"].to_numpy(), exp["value_r"].to_numpy(), equal_nan=True
    )


def test_sliding_window_covers_tumbling(_ray):
    """hop == window degenerates to the tumbling window exactly."""
    import ray.data
    from exactextractr_ray.stages.sessions import sliding_window, tumbling_window

    ev = ray.data.read_parquet("/root/testdata/sf0.001/events.parquet")
    a = sliding_window(ev, 3600, 3600).to_pandas().sort_values(
        ["window_start", "event_type"]
    ).reset_index(drop=True)
    ev2 = ray.data.read_parquet("/root/testdata/sf0.001/events.parquet")
    b = tumbling_window(ev2, 3600).to_pandas().sort_values(
        ["window_start", "event_type"]
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        a[["window_start", "event_type", "n_events"]].astype(
            {"window_start": np.int64, "n_events": np.int64}
        ),
        b[["window_start", "event_type", "n_events"]].astype(
            {"window_start": np.int64, "n_events": np.int64}
        ),
    )
    with pytest.raises(ValueError, match="multiple"):
        sliding_window(ev, 3600, 1000)


def test_interval_join_drops_uncovered(_ray):
    """Rows outside every interval of their key (or with unknown keys) drop;
    covered rows attach the right interval's columns."""
    import ray
    import ray.data
    from exactextractr_ray.stages.sessions import interval_join

    intervals = pd.DataFrame(
        {
            "user_id": [1, 1, 2],
            "start_us": [100, 500, 0],
            "end_us": [200, 600, 50],
            "session_seq": [0, 1, 0],
        }
    )
    events = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 2, 3],
            "event_id": [10, 11, 12, 13, 14],
            "ts": pd.Series(
                np.array([150, 300, 600, 25, 10], dtype="datetime64[us]")
            ),
        }
    )
    out = interval_join(
        ray.data.from_pandas(events), ray.put(intervals)
    ).to_pandas().sort_values("event_id")
    # 150 -> session 0; 300 uncovered; 600 -> session 1 (inclusive end);
    # user 2 at 25 -> session 0; user 3 unknown -> dropped
    assert list(out["event_id"]) == [10, 12, 13]
    assert list(out["session_seq"]) == [0, 1, 0]


def test_chunk_documents(_ray):
    """Fixed-size overlap chunking: boundaries, overlap bytes, reassembly."""
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from exactextractr_ray.stages.text import chunk_batch, chunk_documents

    texts = ["a" * 1000, "b" * 512, "c" * 100, "", "d" * 513]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(5), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    out = chunk_documents(
        ray.data.from_arrow(tbl), size=512, overlap=64
    ).to_pandas().sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)

    # doc 0: 1000 chars, step 448 -> starts 0, 448, 896 -> 3 chunks
    d0 = out[out.doc_id == 0]
    assert list(d0["char_start"]) == [0, 448, 896]
    assert list(d0["chunk"].str.len()) == [512, 512, 104]
    # consecutive chunks overlap by 64 chars
    assert d0["chunk"].iloc[0][-64:] == d0["chunk"].iloc[1][:64]
    # doc 1: exactly one full chunk + the 64-char tail chunk
    d1 = out[out.doc_id == 1]
    assert list(d1["chunk"].str.len()) == [512, 64]
    # doc 2: single short chunk; doc 3 (empty): no chunks
    assert list(out[out.doc_id == 2]["chunk"].str.len()) == [100]
    assert len(out[out.doc_id == 3]) == 0
    # doc 4: 513 chars -> second chunk is the 65-char tail
    assert list(out[out.doc_id == 4]["chunk"].str.len()) == [512, 65]

    # reassembly: dropping the overlap prefix of every later chunk
    # reconstructs the document
    for did, t in zip(range(5), texts):
        chunks = out[out.doc_id == did]["chunk"].tolist()
        rebuilt = "".join(
            [chunks[0]] + [c[64:] for c in chunks[1:]]
        ) if chunks else ""
        assert rebuilt == t, did

    with pytest.raises(ValueError, match="overlap"):
        chunk_batch(tbl, size=64, overlap=64)


def test_ngram_counts(_ray):
    """Corpus bigram counts: partial in-batch combining + groupby sum."""
    import pyarrow as pa
    import ray.data

    from exactextractr_ray.stages.text import ngram_counts

    docs = [
        "the cat sat",
        "the cat  ran",   # double space: whitespace-run tokenization
        " the dog sat ",  # leading/trailing space dropped
        "single",
        "",
    ]
    tbl = pa.table({"text": pa.array(docs, pa.string())})
    out = (
        ngram_counts(ray.data.from_arrow(tbl), n=2)
        .to_pandas()
        .set_index("ngram")["cnt"]
        .to_dict()
    )
    assert out == {
        "the cat": 2,
        "cat sat": 1,
        "cat ran": 1,
        "the dog": 1,
        "dog sat": 1,
    }

    tri = (
        ngram_counts(ray.data.from_arrow(tbl), n=3)
        .to_pandas()
        .set_index("ngram")["cnt"]
        .to_dict()
    )
    assert tri == {"the cat sat": 1, "the cat ran": 1, "the dog sat": 1}


def test_contamination_counts(_ray):
    """Broadcast decontamination semi-join: distinct shared-bigram counts."""
    import pyarrow as pa
    import ray.data

    from exactextractr_ray.stages.text import contamination_counts

    docs = [
        "alpha beta gamma",       # shares 'alpha beta' and 'beta gamma'
        "alpha beta alpha beta",  # distinct hits: 1 ('alpha beta')
        "delta epsilon",          # clean
        "",                       # clean
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(4), pa.int64()),
            "text": pa.array(docs, pa.string()),
        }
    )
    test_set = {"alpha beta", "beta gamma", "unseen gram"}
    out = (
        contamination_counts(ray.data.from_arrow(tbl), test_set, n=2)
        .to_pandas()
        .sort_values("doc_id")
    )
    assert list(out["n_hits"]) == [2, 1, 0, 0]


def test_deterministic_shuffle(_ray):
    """Seeded shuffle: a valid permutation, stable across block layouts,
    and salt-sensitive."""
    import pyarrow as pa
    import ray.data

    from exactextractr_ray.stages.shuffle import deterministic_shuffle

    n = 300
    tbl = pa.table({"doc_id": pa.array(range(n), pa.int64())})

    def run(blocks, salt):
        ds = ray.data.from_arrow(tbl).repartition(blocks)
        out = deterministic_shuffle(ds, salt=salt).to_pandas()
        return out.sort_values("doc_id")["shuffle_pos"].to_numpy()

    a = run(1, "s1")
    b = run(7, "s1")
    # valid permutation of 0..n-1, invariant to the physical block layout
    assert sorted(a) == list(range(n))
    np.testing.assert_array_equal(a, b)
    # a different salt gives an (almost surely) different permutation
    c = run(4, "s2")
    assert sorted(c) == list(range(n))
    assert not np.array_equal(a, c)


def test_asof_join_hot_key_multibucket(_ray):
    """Round-4 regression: asof_join salts the shuffle by (key, time
    bucket) so a hot key spreads across buckets. Fixture: one user owns
    90% of rows spanning 30 days, rights are sparse (whole days with no
    right rows force the phase-2 cross-bucket stitch), one user has no
    rights at all, and exact-tie timestamps exercise the deterministic
    tie rule. Compared against pandas merge_asof."""
    import ray.data
    from exactextractr_ray.stages.sessions import asof_join

    rng = np.random.default_rng(11)
    day_us = 86_400_000_000
    t0 = 1_700_000_000_000_000

    def mk(n, users, days):
        return pd.DataFrame(
            {
                "event_id": np.arange(n),
                "user_id": users,
                "ts": (
                    t0 + rng.integers(0, days, n) * day_us
                    + rng.integers(0, day_us, n)
                ).astype("datetime64[us]"),
                "value": rng.normal(size=n),
            }
        )

    n_l, n_r = 3000, 400
    lu = np.where(rng.random(n_l) < 0.9, 7, rng.integers(0, 5, n_l))
    left = mk(n_l, lu, 30)
    # rights: hot user only on days 0-9 (days 10-29 resolve cross-bucket);
    # user 4 gets NO rights
    ru = np.where(rng.random(n_r) < 0.8, 7, rng.integers(0, 4, n_r))
    right = mk(n_r, ru, 10)
    right["event_id"] += 10_000
    # exact-tie rows: two rights at the same ts as a left
    tie_ts = left["ts"].iloc[0]
    right = pd.concat(
        [right, pd.DataFrame({
            "event_id": [99_001, 99_002],
            "user_id": [int(left["user_id"].iloc[0])] * 2,
            "ts": np.array([tie_ts, tie_ts], dtype="datetime64[us]"),
            "value": [1.5, 2.5],
        })],
        ignore_index=True,
    )

    got = (
        asof_join(
            ray.data.from_pandas(left).repartition(7),
            ray.data.from_pandas(right).repartition(3),
            value_cols=("event_id", "value"),
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert len(got) == n_l

    rs = right.sort_values(["ts", "event_id", "value"]).rename(
        columns={"event_id": "event_id_r", "value": "value_r"}
    )
    exp = pd.merge_asof(
        left.sort_values("ts", kind="mergesort"),
        rs, on="ts", by="user_id", direction="backward",
    ).sort_values("event_id").reset_index(drop=True)
    np.testing.assert_allclose(
        got["event_id_r"].to_numpy(), exp["event_id_r"].to_numpy()
    )
    np.testing.assert_allclose(got["value_r"].to_numpy(), exp["value_r"].to_numpy())
    # user 4 really had no rights -> all NaN
    assert got[got.user_id == 4]["event_id_r"].isna().all()
    # hot-user lefts in right-free days resolved from earlier buckets
    hot_late = got[(got.user_id == 7)
                   & (got["ts"] >= pd.Timestamp(t0 + 12 * day_us, unit="us"))]
    assert len(hot_late) > 100 and hot_late["event_id_r"].notna().all()
