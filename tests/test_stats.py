"""Golden stat-value tests transcribed from the reference's R testthat suite
(/root/reference/tests/testthat/test_exact_extract.R:18-197) and C++ stats
tests (test_stats.cpp). Pure kernel tests — no Ray."""

import math

import numpy as np
import pytest

from exactextractr_ray import wkbio
from exactextractr_ray.coverage import coverage_fraction_wkb
from exactextractr_ray.grid import Grid
from exactextractr_ray.stats import RasterStats

G3 = Grid(0, 0, 3, 3, 1, 1)
SQUARE = wkbio.rect_wkb(0.5, 0.5, 2.5, 2.5)
VALUES_1_9 = np.arange(1.0, 10.0).reshape(3, 3)  # row-major from top


def stats_for(values, wkb=SQUARE, grid=G3, weights=None, store=True):
    cov = coverage_fraction_wkb(grid, wkb)
    st = RasterStats(store_values=store)
    st.process(values, cov, weights)
    return st


def test_all_named_stats_golden():
    # test_exact_extract.R:18-63 on the 3x3 fixture
    st = stats_for(VALUES_1_9)
    assert st.count() == 4.0
    assert st.sum() == 20.0
    assert st.mean() == 5.0
    assert st.stat_min() == 1.0
    assert st.stat_max() == 9.0
    assert st.mode() == 5.0
    assert st.minority() == 1.0
    assert st.variety() == 9
    assert st.median() == 5.0
    assert st.quantile(0.25) == pytest.approx(3.5)
    assert st.quantile(0.75) == pytest.approx(6.5)
    assert st.variance() == pytest.approx(5.0)
    assert st.stdev() == pytest.approx(math.sqrt(5.0))
    assert st.coefficient_of_variation() == pytest.approx(math.sqrt(5.0) / 5.0)


def test_weighted_stats_golden():
    # test_exact_extract.R:65-106 — weights: bottom row ones, rest zero
    weights = np.zeros((3, 3))
    weights[2, :] = 1.0
    st = stats_for(VALUES_1_9, weights=weights)
    assert st.weighted_mean() == pytest.approx(8.0)
    assert st.weighted_sum() == pytest.approx(8.0)
    assert st.weighted_variance() == pytest.approx(0.5)
    assert st.weighted_stdev() == pytest.approx(0.7071068, rel=1e-7)


def test_frac_golden():
    # test_exact_extract.R:108-135 — categorical values / weights
    values = np.repeat([1.0, 2.0, 3.0], 3).reshape(3, 3)
    weights = np.repeat([3.0, 2.0, 1.0], 3).reshape(3, 3)
    st = stats_for(values, weights=weights)
    assert st.frac() == {1.0: 0.25, 2.0: 0.5, 3.0: 0.25}
    assert st.weighted_frac() == {1.0: 0.375, 2.0: 0.5, 3.0: 0.125}


def test_na_handling():
    # test_exact_extract.R:176-197 — NA cells are skipped entirely
    g10 = Grid(0, 0, 10, 10, 1, 1)
    values = np.arange(1.0, 101.0).reshape(10, 10)
    values[6:10, 0:4] = np.nan  # rows 7-10, cols 1-4 (1-based)
    st = stats_for(values, wkb=wkbio.rect_wkb(3.5, 3.5, 4.5, 4.5), grid=g10)
    assert st.sum() == pytest.approx(43.5)


def test_nan_weight_poisons_weighted_stats_only():
    # raster_stats.h:101-110 — NODATA weight processed as NaN
    weights = np.ones((3, 3))
    weights[1, 1] = np.nan
    st = stats_for(VALUES_1_9, weights=weights)
    assert st.count() == 4.0  # unweighted unaffected
    assert st.mean() == 5.0
    assert math.isnan(st.weighted_mean())
    assert math.isnan(st.weighted_sum())


def test_merge_equals_sequential():
    rng = np.random.default_rng(7)
    values = rng.uniform(-10, 10, size=(16, 16))
    values[rng.random((16, 16)) < 0.1] = np.nan
    cov = rng.random((16, 16))
    weights = rng.uniform(0, 2, size=(16, 16))

    whole = RasterStats(store_values=True)
    whole.process(values, cov, weights)

    merged = RasterStats(store_values=True)
    for r0, c0 in [(0, 0), (0, 8), (8, 0), (8, 8)]:
        part = RasterStats(store_values=True)
        part.process(
            values[r0 : r0 + 8, c0 : c0 + 8],
            cov[r0 : r0 + 8, c0 : c0 + 8],
            weights[r0 : r0 + 8, c0 : c0 + 8],
        )
        merged.merge(part)

    assert merged.count() == pytest.approx(whole.count(), rel=1e-12)
    assert merged.sum() == pytest.approx(whole.sum(), rel=1e-12)
    assert merged.mean() == pytest.approx(whole.mean(), rel=1e-12)
    assert merged.variance() == pytest.approx(whole.variance(), rel=1e-9)
    assert merged.weighted_variance() == pytest.approx(
        whole.weighted_variance(), rel=1e-9
    )
    assert merged.stat_min() == whole.stat_min()
    assert merged.stat_max() == whole.stat_max()
    assert merged.variety() == whole.variety()
    assert merged.median() == pytest.approx(whole.median(), rel=1e-12)


def test_variance_matches_closed_form():
    # test_stats.cpp: variance against the definition
    rng = np.random.default_rng(11)
    x = rng.uniform(0, 100, 500)
    c = rng.random(500)
    st = RasterStats()
    # process in chunks to exercise batch+merge paths
    for i in range(0, 500, 61):
        st.process(x[i : i + 61], c[i : i + 61])
    mu = np.sum(x * c) / np.sum(c)
    var = np.sum(c * (x - mu) ** 2) / np.sum(c)
    assert st.variance() == pytest.approx(var, rel=1e-10)
    assert st.mean() == pytest.approx(mu, rel=1e-12)


def test_weighted_quantile_reference_algorithm():
    """weighted_quantiles.cpp:20-70 — interpolation on s_i = i*w_i +
    (n-1)*cumsum_{i-1}. With equal weights this reduces to R type-7."""
    st = RasterStats(store_values=True)
    st.process(np.array([1.0, 2.0, 3.0, 4.0]), np.ones(4))
    for q in [0.0, 0.25, 0.5, 0.9, 1.0]:
        assert st.quantile(q) == pytest.approx(float(np.quantile([1, 2, 3, 4], q)))


def test_quantile_single_value():
    st = RasterStats(store_values=True)
    st.process(np.array([5.0]), np.array([0.3]))
    assert st.quantile(0.5) == 5.0


def test_empty_stats_nan():
    st = RasterStats(store_values=True)
    assert st.count() == 0.0
    assert math.isnan(st.mean())
    assert math.isnan(st.stat_min())
    assert math.isnan(st.median())
    assert st.variety() == 0


def test_mode_tie_breaks():
    # mode tie -> greatest value; minority tie -> smallest
    st = RasterStats(store_values=True)
    st.process(np.array([1.0, 2.0, 3.0]), np.array([0.5, 0.5, 0.5]))
    assert st.mode() == 3.0
    assert st.minority() == 1.0


def test_serialization_roundtrip():
    rng = np.random.default_rng(3)
    st = RasterStats(store_values=True)
    st.process(rng.integers(0, 5, 50).astype(float), rng.random(50), rng.random(50))
    st2 = RasterStats.from_row(st.to_row(), store_values=True)
    assert st2.mean() == st.mean()
    assert st2.variance() == st.variance()
    assert st2.median() == st.median()
    assert st2.weighted_mean() == st.weighted_mean()
    assert st2.frac() == st.frac()
