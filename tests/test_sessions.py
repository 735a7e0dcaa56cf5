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
