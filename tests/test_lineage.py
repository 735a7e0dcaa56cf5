"""Resumable partitioned output: lineage manifest, crash recovery,
fingerprint invalidation."""

import glob
import json
import os

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def _ray(ray_session):
    return None


def _factory_calls(tmp_path):
    calls = []

    def factory(key, spec):
        import ray.data

        calls.append(key)
        lo, hi = spec
        return ray.data.range(hi - lo).map_batches(
            lambda b, lo=lo: pd.DataFrame(
                {"x": b["id"] + lo, "sq": (b["id"] + lo) ** 2}
            ),
            batch_format="pandas",
        )

    return factory, calls


def test_resumable_write_and_resume(_ray, tmp_path):
    from exactextractr_ray.state.lineage import (
        LineageManifest,
        read_resumable,
        resumable_write,
    )

    out = str(tmp_path / "out")
    parts = {"p0": (0, 100), "p1": (100, 200), "p2": (200, 300)}
    factory, calls = _factory_calls(tmp_path)

    res = resumable_write(out, "squares", parts, factory, lambda k, s: f"v1:{s}")
    assert res["written"] == ["p0", "p1", "p2"] and res["skipped"] == []
    assert sorted(calls) == ["p0", "p1", "p2"]

    # resume: nothing recomputed
    calls.clear()
    res2 = resumable_write(out, "squares", parts, factory, lambda k, s: f"v1:{s}")
    assert res2["written"] == [] and sorted(res2["skipped"]) == ["p0", "p1", "p2"]
    assert calls == []

    df = read_resumable(out).to_pandas().sort_values("x").reset_index(drop=True)
    assert len(df) == 300
    assert (df["sq"] == df["x"] ** 2).all()

    # lineage records carry metrics
    recs = LineageManifest(out, "squares").records()
    assert len(recs) == 3
    assert all(r["metrics"]["rows"] == 100 for r in recs)


def test_crash_partition_redone(_ray, tmp_path):
    from exactextractr_ray.state.lineage import read_resumable, resumable_write

    out = str(tmp_path / "out")
    parts = {"a": (0, 50), "b": (50, 100)}
    factory, calls = _factory_calls(tmp_path)
    resumable_write(out, "s", parts, factory, "fp")

    # simulate a crash that wrote data but died before the manifest commit:
    # the partition's parquet files REMAIN on disk (write_parquet finished),
    # only the manifest record is missing
    os.remove(os.path.join(out, "_manifest", "b.json"))
    assert glob.glob(os.path.join(out, "part=b", "*.parquet"))
    calls.clear()
    res = resumable_write(out, "s", parts, factory, "fp")
    assert res["written"] == ["b"] and res["skipped"] == ["a"]
    assert calls == ["b"]

    # the redo must have cleared the stale files first: re-reading must give
    # exactly the logical rows, not duplicates (Ray names output files with a
    # per-execution UUID, so stale files would otherwise survive the rewrite)
    df = read_resumable(out).to_pandas()
    assert len(df) == 100
    assert sorted(df["x"]) == list(range(100))


def test_fingerprint_invalidation(_ray, tmp_path):
    from exactextractr_ray.state.lineage import resumable_write

    out = str(tmp_path / "out")
    parts = {"a": (0, 10)}
    factory, calls = _factory_calls(tmp_path)
    resumable_write(out, "s", parts, factory, "input-v1")
    calls.clear()
    # same key, changed input -> recompute
    res = resumable_write(out, "s", parts, factory, "input-v2")
    assert res["written"] == ["a"]
    assert calls == ["a"]

    # invalidation rewrites in place — the old run's files must be gone
    from exactextractr_ray.state.lineage import read_resumable

    assert len(read_resumable(out).to_pandas()) == 10
