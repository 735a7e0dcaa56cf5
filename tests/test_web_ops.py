"""snapshot_diff (stages/web.py): crawl-diff with full-outer semantics."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


@pytest.fixture
def _ray(ray_session):
    yield


def _snap(rows, parallelism=1):
    import ray.data

    ds = ray.data.from_arrow(
        pa.table(
            {
                "key": pa.array([r[0] for r in rows], pa.int64()),
                "h": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )
    return ds.repartition(parallelism) if parallelism > 1 else ds


OLD = [(1, "a"), (2, "b"), (3, "c"), (4, "d")]
NEW = [(2, "b"), (3, "C"), (4, "d"), (5, "e")]
EXPECT = {1: "removed", 2: "unchanged", 3: "changed", 4: "unchanged", 5: "added"}


def _run(parallelism=1, **kw):
    from exactextractr_ray.stages.web import snapshot_diff

    df = (
        snapshot_diff(
            _snap(OLD, parallelism), _snap(NEW, parallelism), "key", "h", **kw
        )
        .to_pandas()
        .sort_values("key")
        .reset_index(drop=True)
    )
    return df


def test_snapshot_diff_statuses(_ray):
    df = _run()
    assert dict(zip(df["key"], df["status"])) == EXPECT


def test_snapshot_diff_parallelism_invariant(_ray):
    a = _run()
    b = _run(parallelism=5, num_coarse_groups=3)
    pd.testing.assert_frame_equal(a, b)


def test_snapshot_diff_disjoint(_ray):
    from exactextractr_ray.stages.web import snapshot_diff

    df = (
        snapshot_diff(_snap([(1, "x")]), _snap([(2, "y")]), "key", "h")
        .to_pandas()
        .sort_values("key")
        .reset_index(drop=True)
    )
    assert dict(zip(df["key"], df["status"])) == {1: "removed", 2: "added"}
