"""int16 tile storage (the DRAM-bandwidth lever, PERF.md): integer tiles
carry a -32768 NODATA sentinel and feed RasterStats' exact int64 interior
accumulators; every stat must be BIT-IDENTICAL to the float64 path.

The guarantee is arithmetic, not approximate: int64 sums of int16 values
(and of their squares, each < 2^30) are exact, and any integer < 2^53
converts to float64 without rounding, so the partial state after an
integer-path tile equals the float-path state byte for byte.
"""

import numpy as np
import pytest

from exactextractr_ray.stats import INT_NODATA, RasterStats
from exactextractr_ray import synth


def _pair(values_f64, weights_f64=None):
    """Build (float-path state, int-path state) from the same cells."""
    a = RasterStats(store_values=True)
    a.process(values_f64, None, weights_f64)
    vi = np.where(np.isnan(values_f64), INT_NODATA, values_f64).astype(np.int16)
    wi = None if weights_f64 is None else weights_f64.astype(np.int16)
    b = RasterStats(store_values=True)
    b.process(vi, None, wi)
    return a, b


def _assert_state_identical(a: RasterStats, b: RasterStats):
    for f in ("sum_ci", "sum_xici", "sum_ciwi", "sum_xiciwi",
              "sum_x2ci", "sum_x2ciwi", "min", "max"):
        assert getattr(a, f) == getattr(b, f), f
    for v in ("var", "wvar"):
        va, vb = getattr(a, v), getattr(b, v)
        assert (va.sum_w, va.mean, va.t) == (vb.sum_w, vb.mean, vb.t), v
    assert a.freq == b.freq


def test_int_unit_path_state_bitident():
    rng = np.random.RandomState(7)
    vals = rng.randint(0, 1000, size=4096).astype(np.float64)
    vals[rng.rand(4096) < 0.05] = np.nan
    w = rng.randint(1, 8, size=4096).astype(np.float64)
    a, b = _pair(vals, w)
    _assert_state_identical(a, b)
    a, b = _pair(vals, None)
    _assert_state_identical(a, b)


def test_int_unit_path_all_nodata():
    vals = np.full(64, np.nan)
    a, b = _pair(vals)
    _assert_state_identical(a, b)
    assert a.sum_ci == 0.0


def test_int_with_cov_converts_sentinel():
    """With an explicit coverage array the integer input is converted to
    float64 with sentinel -> NaN inside process(): same result as float."""
    vals = np.array([1.0, np.nan, 3.0, 700.0])
    cov = np.array([0.25, 0.5, 1.0, 0.0625])
    a = RasterStats()
    a.process(vals, cov)
    vi = np.where(np.isnan(vals), INT_NODATA, vals).astype(np.int16)
    b = RasterStats()
    b.process(vi, cov)
    assert (a.sum_ci, a.sum_xici, a.min, a.max) == \
        (b.sum_ci, b.sum_xici, b.min, b.max)


def test_mixed_dtype_weight_falls_back():
    """int16 values + float weights: the fast path declines (it cannot
    certify integer weight sums) and the float path handles the sentinel."""
    vals = np.array([5.0, np.nan, 9.0])
    w = np.array([0.5, 2.0, 1.5])
    a = RasterStats()
    a.process(vals, None, w)
    vi = np.where(np.isnan(vals), INT_NODATA, vals).astype(np.int16)
    b = RasterStats()
    b.process(vi, None, w)
    assert (a.sum_ci, a.sum_xiciwi, a.sum_ciwi) == \
        (b.sum_ci, b.sum_xiciwi, b.sum_ciwi)


def test_synth_int16_matches_float64():
    rr = np.broadcast_to(np.arange(200)[:, None], (200, 160))
    cc = np.broadcast_to(np.arange(160)[None, :], (200, 160))
    f = synth.synth_values(rr, cc, dtype=np.float64)
    i = synth.synth_values(rr, cc, dtype=np.int16)
    hole = np.isnan(f)
    assert (i[hole] == INT_NODATA).all()
    assert (i[~hole] == f[~hole]).all()
    assert (synth.synth_weights(rr, cc, dtype=np.int16)
            == synth.synth_weights(rr, cc, dtype=np.float64)).all()


@pytest.mark.parametrize("weighted", [False, True])
def test_exact_extract_int16_bitident(ray_session, weighted):
    """End-to-end: the full zonal pipeline over int16 tiles returns a
    byte-identical table to float64 tiles — interior fast path, boundary
    coverage kernel, stored-value stats and the weighted family all on
    one small grid."""
    from exactextractr_ray.pipelines.zonal import exact_extract
    from exactextractr_ray.sources.raster import synthetic_raster_dataset
    from exactextractr_ray.sources.zones import synth_rect_zones

    stats = ["count", "sum", "mean", "min", "max", "stdev", "variance",
             "median", "mode", "variety", "frac"]
    kw = {}
    layers = ("value",)
    if weighted:
        stats += ["weighted_mean", "weighted_sum", "weighted_stdev"]
        kw["weight_layer"] = "weight"
        layers = ("value", "weight")
    zones = synth_rect_zones(12, 64)
    outs = {}
    for dt in (np.float64, np.int16):
        rd = synthetic_raster_dataset(n=64, tile=16, layers=layers, dtype=dt)
        outs[dt] = (
            exact_extract(rd, zones, stats, **kw)
            .to_pandas().sort_values("zone_id").reset_index(drop=True)
        )
    assert outs[np.float64].equals(outs[np.int16])


def test_exact_extract_int16_coverage_area_and_default(ray_session):
    from exactextractr_ray.pipelines.zonal import exact_extract
    from exactextractr_ray.sources.raster import synthetic_raster_dataset
    from exactextractr_ray.sources.zones import synth_rect_zones

    zones = synth_rect_zones(8, 64)
    for kw in ({"coverage_area": True}, {"default_value": 500.0}):
        outs = {}
        for dt in (np.float64, np.int16):
            rd = synthetic_raster_dataset(n=64, tile=16, dtype=dt)
            outs[dt] = (
                exact_extract(rd, zones, ["count", "sum", "mean"], **kw)
                .to_pandas().sort_values("zone_id").reset_index(drop=True)
            )
        assert outs[np.float64].equals(outs[np.int16]), kw
