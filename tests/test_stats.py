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


# ---- test_stats.cpp transcriptions (C++ accumulator goldens) ----

def test_west_variance_equal_weights():
    # test_stats.cpp:390-402 — all observations weighted 3.0
    v = np.array([3.4, 2.9, 1.7, 8.8, -12.7, 100.4, 8.4, 11.3])
    st = RasterStats(store_values=False)
    st.process(v, np.ones(len(v)), np.full(len(v), 3.0))
    assert st.weighted_stdev() == pytest.approx(32.80967, rel=1e-6)
    assert st.weighted_variance() == pytest.approx(1076.474, rel=1e-6)
    assert st.weighted_stdev() / st.weighted_mean() == pytest.approx(
        2.113344, rel=1e-6
    )


def test_west_variance_unequal_weights():
    # test_stats.cpp:403-416 — goldens from Weighted.Desc.Stat::w.sd / w.var
    v = np.array([3.4, 2.9, 1.7, 8.8, -12.7, 100.4, 8.4, 11.3, 50])
    w = np.array([1.0, 0.1, 1.0, 0.2, 0.44, 0.3, 0.3, 0.83, 0])
    st = RasterStats(store_values=False)
    st.process(v, np.ones(len(v)), w)
    assert st.weighted_stdev() == pytest.approx(25.90092, rel=1e-6)
    assert st.weighted_variance() == pytest.approx(670.8578, rel=1e-6)
    assert st.weighted_stdev() / st.weighted_mean() == pytest.approx(
        2.478301, rel=1e-6
    )


def test_west_variance_initial_zeros():
    # test_stats.cpp:417-430 — leading zero weights must not corrupt state
    v = np.arange(1.0, 10.0)
    w = np.array([0, 0, 0, 0, 0, 0, 0.25, 0.5, 0.25])
    st = RasterStats(store_values=False)
    st.process(v, np.ones(9), w)
    assert st.weighted_stdev() == pytest.approx(0.7071068, rel=1e-6)
    assert st.weighted_variance() == pytest.approx(0.5, rel=1e-6)
    assert st.weighted_stdev() / st.weighted_mean() == pytest.approx(
        0.7071068 / 8, rel=1e-6
    )


def test_weighted_quantile_equal_weights_golden():
    # test_stats.cpp:431-446 — every value weighted 1.7; matches R
    # stats::quantile. (The reference feeds its quantile accumulator from
    # the distinct-value coverage map, raster_stats.h:225 — same design as
    # here, so the goldens carry over exactly.)
    v = np.array([3.4, 2.9, 1.7, 8.8, -12.7, 100.4, 8.4, 11.3])
    st = RasterStats(store_values=True)
    st.process(v, np.full(len(v), 1.7))
    assert st.quantile(0) == -12.7
    assert st.quantile(0.25) == pytest.approx(2.6)
    assert st.quantile(0.50) == pytest.approx(5.9)
    assert st.quantile(0.75) == pytest.approx(9.425)
    assert st.quantile(1.0) == pytest.approx(100.4)


def test_weighted_quantile_invalid_q():
    # test_stats.cpp:471-481 — invalid quantile raises
    st = RasterStats(store_values=True)
    st.process(np.array([1.0, 2.0]), np.ones(2))
    with pytest.raises(ValueError, match="Quantile"):
        st.quantile(-0.1)
    with pytest.raises(ValueError, match="Quantile"):
        st.quantile(1.1)


def test_category_subsets():
    # test_stats.cpp:314-340 — per-category count/frac/weighted variants
    landcov = np.array([1, 1, 1, 2, 2, 2], dtype=float)
    cov = np.array([0.5, 0.4, 0, 0.3, 0.3, 0.2])
    weight = np.array([0.3, 0.4, 1, 4.0, 3.0, 0])
    st = RasterStats(store_values=True)
    st.process(landcov, cov, weight)

    frac = st.frac()
    assert frac[1] == pytest.approx(0.9 / st.count())
    assert frac[2] == pytest.approx(0.8 / st.count())
    assert 3 not in frac

    wfrac = st.weighted_frac()
    assert wfrac[1] == pytest.approx((0.5 * 0.3 + 0.4 * 0.4) / st.sum_ciwi)
    assert wfrac[2] == pytest.approx((0.3 * 4.0 + 0.3 * 3.0) / st.sum_ciwi)
    assert 3 not in wfrac


def test_missing_data_matrix():
    # test_stats.cpp:131-314 — the full NODATA combination matrix on a 2x2
    # grid where the polygon covers 25% of each cell
    cov = np.full(4, 0.25)
    NA = float("nan")
    all_missing = np.full(4, NA)
    all_defined = np.array([1.0, 2.0, 3.0, 4.0])
    some_defined = np.array([1.0, 2.0, NA, NA])

    # all values missing, no weights
    st = RasterStats(store_values=True)
    st.process(all_missing, cov)
    assert st.count() == 0 and st.sum() == 0
    assert math.isnan(st.stat_min()) and math.isnan(st.stat_max())
    assert math.isnan(st.mean()) and math.isnan(st.weighted_mean())
    assert math.isnan(st.coefficient_of_variation())
    assert math.isnan(st.mode()) and math.isnan(st.minority())
    assert st.variety() == 0
    assert st.sum_ciwi == st.count() and st.weighted_sum() == st.sum()

    # all values defined, no weights
    st = RasterStats(store_values=True)
    st.process(all_defined, cov)
    assert st.count() == 1.0 and st.sum() == 2.5
    assert st.stat_min() == 1.0 and st.stat_max() == 4.0
    assert st.mean() == 2.5
    assert st.mode() == 4.0 and st.minority() == 1.0
    assert st.variance() == pytest.approx(1.25)
    assert st.stdev() == pytest.approx(1.118034)
    assert st.weighted_variance() == pytest.approx(st.variance())
    assert st.coefficient_of_variation() == pytest.approx(0.4472136)
    assert st.weighted_sum() == st.sum() and st.weighted_mean() == st.mean()

    # some values defined, no weights
    st = RasterStats(store_values=True)
    st.process(some_defined, cov)
    assert st.count() == 0.5 and st.sum() == 0.75
    assert st.stat_min() == 1.0 and st.stat_max() == 2.0
    assert st.mean() == 1.5
    assert st.mode() == 2.0 and st.minority() == 1.0
    assert st.variance() == pytest.approx(0.25)
    assert st.stdev() == pytest.approx(0.5)
    assert st.coefficient_of_variation() == pytest.approx(0.333333, rel=1e-5)

    # no values defined, all weights defined
    st = RasterStats(store_values=True)
    st.process(all_missing, cov, all_defined)
    assert st.count() == 0 and st.sum() == 0
    assert math.isnan(st.mean()) and math.isnan(st.weighted_mean())
    assert st.weighted_sum() == 0

    # all values defined, NO weights defined (all-NaN weights poison)
    st = RasterStats(store_values=True)
    st.process(all_defined, cov, all_missing)
    assert st.count() == 1.0 and st.sum() == 2.5
    assert st.mean() == 2.5
    assert st.variance() == pytest.approx(1.25)
    assert math.isnan(st.sum_ciwi) and math.isnan(st.weighted_sum())
    assert math.isnan(st.weighted_mean())
    assert math.isnan(st.weighted_variance())
    assert math.isnan(st.weighted_stdev())

    # all values defined, SOME weights defined (any NaN weight poisons)
    st = RasterStats(store_values=True)
    st.process(all_defined, cov, some_defined)
    assert st.count() == 1.0 and st.sum() == 2.5
    assert st.variance() == pytest.approx(1.25)
    assert math.isnan(st.weighted_sum()) and math.isnan(st.weighted_mean())


def test_unweighted_stats_offset_grid_golden():
    # test_stats.cpp:55-99 — 5x5 grid at (-1,-1), NA cell inside the square
    g = Grid(-1, -1, 4, 4, 1, 1)
    cov = coverage_fraction_wkb(g, wkbio.rect_wkb(0.5, 0.5, 2.5, 2.5))
    NA = float("nan")
    values = np.array(
        [
            [1, 1, 1, 1, 1],
            [1, 1, 2, 3, 1],
            [1, 4, 5, 6, 1],
            [1, 0, NA, 7, 1],
            [1, 1, 1, 1, 1],
        ],
        dtype=float,
    )
    st = RasterStats(store_values=True)
    st.process(values, cov)
    assert st.count() == pytest.approx(3.5)
    assert st.sum() == pytest.approx(13.75)
    assert st.mean() == pytest.approx(13.75 / 3.5)
    assert st.mode() == 5 and st.minority() == 0
    assert st.stat_min() == 0 and st.stat_max() == 7
    assert st.variety() == 8


def test_weighted_multiresolution_stats_golden():
    # test_stats.cpp:101-129 — 1-degree values, 2-degree weights, both
    # disaggregated onto the common grid (np.kron is the RasterView analog)
    g = Grid(0, 0, 8, 6, 1, 1)
    cov = coverage_fraction_wkb(g, wkbio.rect_wkb(3.5, 1.5, 6.5, 2.5))
    values = (1.0 + np.arange(48)).reshape(6, 8)
    weights2 = (5.0 + 5.0 * np.arange(12)).reshape(3, 4)
    weights = np.kron(weights2, np.ones((2, 2)))
    st = RasterStats(store_values=False)
    st.process(values, cov, weights)

    cv = np.array([28, 29, 30, 31, 36, 37, 38, 39], dtype=float)
    cw = np.array([30, 35, 35, 40, 50, 55, 55, 60], dtype=float)
    cf = np.array([0.25, 0.5, 0.5, 0.25, 0.25, 0.5, 0.5, 0.25])
    assert st.weighted_mean() == pytest.approx(
        (cv * cw * cf).sum() / (cw * cf).sum()
    )
    assert st.mean() == pytest.approx((cv * cf).sum() / cf.sum())
    # weighted_fraction = weighted_sum / sum
    assert st.weighted_sum() / st.sum() == pytest.approx(
        (cv * cw * cf).sum() / (cv * cf).sum()
    )


def test_internal_stat_trio_goldens():
    """test_stats.cpp:314-340 + :101-129 — the internal C++ finalizers
    count(v), weighted_count()/weighted_count(v), weighted_fraction(),
    frac(v)."""
    landcov = np.array([1, 1, 1, 2, 2, 2], dtype=float)
    cov = np.array([0.5, 0.4, 0, 0.3, 0.3, 0.2])
    weight = np.array([0.3, 0.4, 1, 4.0, 3.0, 0])
    st = RasterStats(store_values=True)
    st.process(landcov, cov, weight)

    assert st.count_value(1.0) == pytest.approx(0.5 + 0.4)
    assert st.count_value(2.0) == pytest.approx(0.3 + 0.3 + 0.2)
    assert st.count_value(3.0) is None

    assert st.frac_value(1.0) == pytest.approx(st.count_value(1.0) / st.count())
    assert st.frac_value(2.0) == pytest.approx(st.count_value(2.0) / st.count())
    assert st.frac_value(3.0) is None

    assert st.weighted_count() == pytest.approx(
        0.5 * 0.3 + 0.4 * 0.4 + 0 * 1 + 0.3 * 4.0 + 0.3 * 3.0 + 0.2 * 0
    )
    assert st.weighted_count_value(1.0) == pytest.approx(0.5 * 0.3 + 0.4 * 0.4)
    assert st.weighted_count_value(2.0) == pytest.approx(0.3 * 4.0 + 0.3 * 3.0)
    assert st.weighted_count_value(3.0) is None

    # weighted_fraction = weighted_sum / sum (test_stats.cpp:128 form)
    wsum = (landcov * cov * weight).sum()
    usum = (landcov * cov).sum()
    assert st.weighted_fraction() == pytest.approx(wsum / usum)
    # result() dispatch exposes the two scalar finalizers
    assert st.result("weighted_count") == st.weighted_count()
    assert st.result("weighted_fraction") == st.weighted_fraction()

    # equal-weights identity: weighted_count == count (test_stats.cpp:186)
    st2 = RasterStats()
    st2.process(landcov, cov, np.ones_like(cov))
    assert st2.weighted_count() == pytest.approx(st2.count())
    # empty stats -> weighted_count 0, weighted_fraction NaN
    st3 = RasterStats()
    assert st3.weighted_count() == 0.0
    assert math.isnan(st3.weighted_fraction())
