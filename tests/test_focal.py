"""Focal 3x3 stats (pipelines/focal.py): halo exchange vs brute force."""

import numpy as np
import pytest

from exactextractr_ray import synth


@pytest.fixture
def _ray(ray_session):
    yield


def _brute(n: int):
    r, c = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    full = synth.synth_values(r, c)
    pad = np.full((n + 2, n + 2), np.nan)
    pad[1:-1, 1:-1] = full
    valid = ~np.isnan(pad)
    filled = np.where(valid, pad, 0.0)
    s = np.zeros((n, n))
    cnt = np.zeros((n, n), np.int64)
    for dr in range(3):
        for dc in range(3):
            s += filled[dr : dr + n, dc : dc + n]
            cnt += valid[dr : dr + n, dc : dc + n]
    mean = np.where(cnt > 0, s / np.maximum(cnt, 1), np.nan)
    return s, cnt, mean


def _run(n: int, tile: int):
    from exactextractr_ray.pipelines.focal import focal_stats_3x3
    from exactextractr_ray.sources.raster import synthetic_raster_dataset

    rd = synthetic_raster_dataset(n=n, tile=tile, dtype=np.float64)
    df = focal_stats_3x3(rd).to_pandas().sort_values("cell").reset_index(drop=True)
    return df


@pytest.mark.parametrize("n,tile", [(64, 16), (50, 16), (20, 7)])
def test_focal_matches_brute_force(_ray, n, tile):
    """Halo exchange == single-array focal, incl. RAGGED edge tiles
    (n not a multiple of tile) and NaN holes."""
    df = _run(n, tile)
    s, cnt, mean = _brute(n)
    assert len(df) == n * n
    assert np.array_equal(df["cell"].to_numpy(), np.arange(n * n))
    assert np.array_equal(df["focal_cnt"].to_numpy(), cnt.ravel())
    assert np.array_equal(df["focal_sum"].to_numpy(), s.ravel())
    got, exp = df["focal_mean"].to_numpy(), mean.ravel()
    assert np.array_equal(np.isnan(got), np.isnan(exp))
    m = ~np.isnan(exp)
    assert np.array_equal(got[m], exp[m])


def test_focal_edge_windows_shrink(_ray):
    """Corner cells see at most 4 window cells, edges at most 6 — the
    NaN halo outside the raster is never counted."""
    n = 16
    df = _run(n, 8)
    cnt = df["focal_cnt"].to_numpy().reshape(n, n)
    assert cnt[0, 0] <= 4 and cnt[0, -1] <= 4
    assert cnt[-1, 0] <= 4 and cnt[-1, -1] <= 4
    assert cnt[0, 1:-1].max() <= 6
    assert cnt[1:-1, 1:-1].max() <= 9


def test_focal_single_tile_equals_tiled(_ray):
    """tile >= n (no exchange at all) produces identical output to a 4x4
    tiling (pure halo-path check)."""
    a = _run(20, 32)
    b = _run(20, 5)
    for col in ("focal_sum", "focal_cnt", "focal_mean"):
        av, bv = a[col].to_numpy(), b[col].to_numpy()
        if av.dtype.kind == "f":
            assert np.array_equal(np.isnan(av), np.isnan(bv))
            m = ~np.isnan(av)
            assert np.array_equal(av[m], bv[m])
        else:
            assert np.array_equal(av, bv)
