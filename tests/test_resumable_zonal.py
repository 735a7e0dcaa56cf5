"""Checkpoint/resume for the AGGREGATION pipeline: band-partitioned partial
stats + merge-on-read finalize == direct exact_extract, bit-for-bit, across
crash/resume histories."""

import os

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def _ray(ray_session):
    return None


STATS = ["count", "sum", "mean", "min", "max", "stdev", "median"]


def _direct(stats=STATS):
    from exactextractr_ray.pipelines.zonal import exact_extract
    from exactextractr_ray.sources.raster import synthetic_raster_dataset
    from exactextractr_ray.sources.zones import synth_rect_zones

    return exact_extract(
        synthetic_raster_dataset(n=32, tile=8), synth_rect_zones(6, 32), stats
    ).to_pandas()


def _assert_frames_bitexact(a: pd.DataFrame, b: pd.DataFrame):
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b)
    for c in a.columns:
        assert np.array_equal(
            a[c].to_numpy(), b[c].to_numpy(), equal_nan=True
        ), c


def test_resumable_zonal_matches_direct(_ray, tmp_path):
    from exactextractr_ray.pipelines.resumable_zonal import resumable_zonal_stats
    from exactextractr_ray.sources.raster import synthetic_raster_dataset
    from exactextractr_ray.sources.zones import synth_rect_zones

    rd = synthetic_raster_dataset(n=32, tile=8)
    zones = synth_rect_zones(6, 32)
    out = str(tmp_path / "zonal")

    result, status = resumable_zonal_stats(rd, zones, STATS, out, bands=4)
    assert len(status["written"]) == 4 and not status["skipped"]
    _assert_frames_bitexact(result.to_pandas(), _direct())

    # crash simulation: one band's manifest lost -> only it recomputes, and
    # the finalized result is still bit-identical
    os.remove(os.path.join(out, "_manifest", "band001.json"))
    result2, status2 = resumable_zonal_stats(rd, zones, STATS, out, bands=4)
    assert status2["written"] == ["band001"]
    assert len(status2["skipped"]) == 3
    _assert_frames_bitexact(result2.to_pandas(), _direct())

    # clean re-run: nothing recomputes, finalize still returns the result
    result3, status3 = resumable_zonal_stats(rd, zones, STATS, out, bands=4)
    assert not status3["written"] and len(status3["skipped"]) == 4
    _assert_frames_bitexact(result3.to_pandas(), _direct())

    # different stats list -> fingerprint change -> full recompute
    result4, status4 = resumable_zonal_stats(
        rd, zones, ["count", "sum"], out, bands=4
    )
    assert len(status4["written"]) == 4
    _assert_frames_bitexact(result4.to_pandas(), _direct(["count", "sum"]))


def test_resumable_zonal_band_count_invariance(_ray, tmp_path):
    """Band partitioning (2 vs 8) never changes the merged result."""
    from exactextractr_ray.pipelines.resumable_zonal import resumable_zonal_stats
    from exactextractr_ray.sources.raster import synthetic_raster_dataset
    from exactextractr_ray.sources.zones import synth_rect_zones

    rd = synthetic_raster_dataset(n=32, tile=8)
    zones = synth_rect_zones(6, 32)
    r2, _ = resumable_zonal_stats(rd, zones, STATS, str(tmp_path / "b2"), bands=2)
    r8, _ = resumable_zonal_stats(rd, zones, STATS, str(tmp_path / "b8"), bands=8)
    _assert_frames_bitexact(r2.to_pandas(), r8.to_pandas())
