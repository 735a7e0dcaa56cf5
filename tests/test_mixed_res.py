"""Mixed-resolution value/weight grids — golden values transcribed from the
reference's 'Weighted multiresolution stats' test
(/root/reference/src/exactextract/test/test_stats.cpp:101-129)."""

import numpy as np
import pytest

from exactextractr_ray import wkbio
from exactextractr_ray.grid import Grid
from exactextractr_ray.pipelines.mixed import exact_extract_mixed
from exactextractr_ray.sources.raster import raster_from_array
from exactextractr_ray.sources.zones import zone_table


@pytest.fixture(scope="module")
def _ray(ray_session):
    return None


def _fixture():
    # extent (0,0,8,6); values 1x1 res filled row-major 1..48;
    # weights 2x2 res filled row-major 5,10,...,60
    vg = Grid(0, 0, 8, 6, 1, 1)
    wg = Grid(0, 0, 8, 6, 2, 2)
    values = (np.arange(48, dtype=float) + 1).reshape(6, 8)
    weights = (np.arange(12, dtype=float) + 1).reshape(3, 4) * 5
    vrd = raster_from_array(values, vg, tile=4)
    wrd = raster_from_array(weights, wg, tile=2)
    poly = wkbio.polygon_wkb(
        [(3.5, 1.5), (6.5, 1.5), (6.5, 2.5), (3.5, 2.5), (3.5, 1.5)]
    )
    return vrd, wrd, zone_table([(0, "z", poly)])


def test_weighted_multiresolution_golden(_ray):
    vrd, wrd, zones = _fixture()
    res = exact_extract_mixed(
        vrd, wrd, zones, ["mean", "weighted_mean"]
    ).to_pandas()
    cov_values = np.array([28, 29, 30, 31, 36, 37, 38, 39], dtype=float)
    cov_weights = np.array([30, 35, 35, 40, 50, 55, 55, 60], dtype=float)
    cov_fracs = np.array([0.25, 0.5, 0.5, 0.25, 0.25, 0.5, 0.5, 0.25])
    assert res["weighted_mean"].iloc[0] == pytest.approx(
        (cov_values * cov_weights * cov_fracs).sum() / (cov_weights * cov_fracs).sum()
    )
    assert res["mean"].iloc[0] == pytest.approx(
        (cov_values * cov_fracs).sum() / cov_fracs.sum()
    )


def test_value_disaggregation_forbids_count_sum(_ray):
    vrd, wrd, zones = _fixture()
    # swap: value raster coarse (2x2), weights fine (1x1)
    with pytest.raises(ValueError, match="count.*sum|Cannot compute"):
        exact_extract_mixed(wrd, vrd, zones, ["count"])
    # but mean works, computed on the finer common grid
    res = exact_extract_mixed(wrd, vrd, zones, ["mean", "weighted_mean"]).to_pandas()
    assert np.isfinite(res["mean"].iloc[0])


def test_incompatible_grids_rejected(_ray):
    vg = Grid(0, 0, 8, 6, 1, 1)
    wg = Grid(0.3, 0, 8.3, 6, 1, 1)  # origin offset not an integer multiple
    vrd = raster_from_array(np.ones((6, 8)), vg, tile=4)
    wrd = raster_from_array(np.ones((6, 8)), wg, tile=4)
    zones = zone_table([(0, "z", wkbio.rect_wkb(1, 1, 4, 4))])
    with pytest.raises(ValueError, match="not compatible"):
        exact_extract_mixed(vrd, wrd, zones, ["mean"])


def test_weight_raster_partial_extent(_ray):
    """Transcribed semantics: test_exact_extract.R:606-641 — a polygon
    partly OUTSIDE the weight raster gets NaN weighted stats (NODATA
    poisoning), never edge-clamped weights; a polygon fully inside computes
    normally. Unweighted stats are unaffected either way."""
    import numpy as np
    from exactextractr_ray.grid import Grid
    from exactextractr_ray.pipelines.mixed import exact_extract_mixed
    from exactextractr_ray.sources.raster import raster_from_array
    from exactextractr_ray.sources.zones import zone_table
    from exactextractr_ray import wkbio

    vg = Grid(0, 0, 8, 8, 1, 1)
    vals = np.arange(64, dtype=float).reshape(8, 8)
    v = raster_from_array(vals, vg, tile=4)
    # weight raster covers only the LEFT half (x in [0, 4)), same resolution
    wgrid = Grid(0, 0, 4, 8, 1, 1)
    wts = np.full((8, 4), 2.0)
    w = raster_from_array(wts, wgrid, tile=4)

    zones = zone_table(
        [
            (0, "inside", wkbio.rect_wkb(0, 0, 4, 8)),     # fully in weights
            (1, "straddle", wkbio.rect_wkb(2, 0, 6, 8)),   # half outside
        ]
    )
    res = exact_extract_mixed(
        v, w, zones, ["weighted_mean", "mean"]
    ).to_pandas().sort_values("zone_id").reset_index(drop=True)
    # constant weights inside -> weighted_mean == mean for the inside zone
    assert res["weighted_mean"].iloc[0] == pytest.approx(res["mean"].iloc[0])
    # straddling zone: NaN weights poison the weighted stat...
    assert np.isnan(res["weighted_mean"].iloc[1])
    # ...but not the unweighted one
    assert np.isfinite(res["mean"].iloc[1])


def test_weight_raster_offset_origin(_ray):
    """Aligned-but-offset weight grid (origin shifted by whole cells) maps
    to the correct weight cells — regression for the origin-shared
    assumption."""
    import numpy as np
    from exactextractr_ray.grid import Grid
    from exactextractr_ray.pipelines.mixed import exact_extract_mixed
    from exactextractr_ray.sources.raster import raster_from_array
    from exactextractr_ray.sources.zones import zone_table
    from exactextractr_ray import wkbio

    vg = Grid(0, 0, 8, 8, 1, 1)
    vals = np.ones((8, 8))
    v = raster_from_array(vals, vg, tile=4)
    # weight grid shifted by (+2, +2), covering x,y in [2, 10); weights
    # equal their GLOBAL x-column so the mapping is observable
    wgrid = Grid(2, 2, 10, 10, 1, 1)
    wcols = np.broadcast_to(np.arange(2, 10, dtype=float)[None, :], (8, 8)).copy()
    w = raster_from_array(wcols, wgrid, tile=4)

    zones = zone_table([(0, "z", wkbio.rect_wkb(3, 3, 6, 6))])  # inside both
    res = exact_extract_mixed(v, w, zones, ["weighted_mean"]).to_pandas()
    # values are all 1 -> weighted_mean of value = 1 regardless, so check
    # via weighted_sum-like identity: use weighted_frac of the single value
    # instead assert the weight sum implicitly: weighted_mean of CONSTANT
    # values is exact 1.0 only if weights mapped to finite cells
    assert res["weighted_mean"].iloc[0] == pytest.approx(1.0)

    # make it sensitive: values = global column index too; weighted mean of
    # x-coord with weight x over x in {3,4,5} = sum(x^2)/sum(x) = 50/12
    vals2 = np.broadcast_to(np.arange(0.5, 8, dtype=float)[None, :], (8, 8)).copy()
    vals2 = np.floor(vals2) + 0.5  # cell-center x
    v2 = raster_from_array(vals2, vg, tile=4)
    res2 = exact_extract_mixed(v2, w, zones, ["weighted_mean"]).to_pandas()
    # zone covers columns 3,4,5 (centers 3.5, 4.5, 5.5); weight at center
    # x=3.5 is wcol floor(3.5)=3 etc -> weights 3,4,5 per column
    num = sum(x * wt for x, wt in [(3.5, 3), (4.5, 4), (5.5, 5)])
    den = 3 + 4 + 5
    assert res2["weighted_mean"].iloc[0] == pytest.approx(num / den, rel=1e-12)


def test_polygon_outside_values_inside_weights_returns_na(_ray):
    # test_exact_extract.R:642-653 — polygon entirely outside the value
    # raster but inside the weighting raster: NA, not an exception
    import math

    from exactextractr_ray import wkbio
    from exactextractr_ray.pipelines.mixed import exact_extract_mixed
    from exactextractr_ray.sources.zones import zone_table

    values = raster_from_array(
        (1.0 + np.arange(25)).reshape(5, 5), Grid(5, 5, 10, 10, 1, 1), tile=5
    )
    weights = raster_from_array(
        np.tile(1.0 + np.arange(10), (10, 1)).T, Grid(0, 0, 10, 10, 1, 1),
        tile=5,
    )
    zones = zone_table([(1, "z", wkbio.circle_wkb(2.1, 2.1, 1, segments=60))])
    res = exact_extract_mixed(
        values, weights, zones, ["weighted_mean"]
    ).to_pandas()
    assert len(res) == 1
    assert math.isnan(res["weighted_mean"].iloc[0])


def test_fractional_cellsize_weighted_extraction(_ray):
    # test_exact_extract.R:1158-1168 — 0.1-degree cells with a polygon whose
    # edges land near cell boundaries; float noise must not desync the
    # value/weight/cell columns
    from exactextractr_ray import wkbio
    from exactextractr_ray.pipelines.zonal import extract_cells
    from exactextractr_ray.sources.zones import zone_table

    n = 10
    r = np.arange(n).reshape(n, 1)
    c = np.arange(n).reshape(1, n)
    vals = ((r + 1) + c * n).astype(float)  # matrix(1:100, nrow=10) col-major
    g = Grid(0, 0, 1, 1, 0.1, 0.1)
    rd = raster_from_array(
        vals, g, tile=5, extra_layers={"w": vals}
    )
    zones = zone_table([(1, "z", wkbio.rect_wkb(0.4, 0.7, 0.5, 0.8))])
    df = extract_cells(
        rd, zones, weight_layer="w", include_cell=True
    ).to_pandas()
    assert len(df) > 0
    cell0 = df["cell"].to_numpy() - 1
    flat = vals.ravel()  # row-major from the top = cell-number order
    np.testing.assert_allclose(df["value"], flat[cell0])
    np.testing.assert_allclose(df["weight"], flat[cell0])


def test_mixedres_copartition_ragged_bruteforce(_ray):
    """Round-4 regression: the co-partitioned plan (weight fragments
    shuffled to value tiles, NO driver-side weight materialization) must
    reproduce the dense brute force on a ragged grid where weight tiles
    misalign with value tiles, so each value tile assembles its weight
    window from MULTIPLE clipped fragments."""
    from exactextractr_ray.coverage import coverage_fraction_wkb

    rng = np.random.default_rng(42)
    # value grid 13x17 cells at 1x1, tile=5 -> ragged both axes
    vg = Grid(0, 0, 17, 13, 1, 1)
    vals = rng.integers(1, 50, size=(13, 17)).astype(float)
    v = raster_from_array(vals, vg, tile=5)
    # weight grid 2x coarser, origin shifted by (-2, +2) whole common
    # cells, tile=3 -> weight tile boundaries never align with value tiles
    wg = Grid(-2, 2, 18, 16, 2, 2)
    wts = rng.integers(1, 9, size=(7, 10)).astype(float)
    w = raster_from_array(wts, wg, tile=3)

    polys = [
        (0, "a", wkbio.polygon_wkb(
            [(0.5, 0.5), (9.3, 1.1), (8.7, 7.9), (1.2, 6.4), (0.5, 0.5)]
        )),
        (1, "b", wkbio.circle_wkb(12.0, 8.0, 4.3, segments=24)),
        (2, "edge", wkbio.rect_wkb(14.5, 10.5, 20.0, 15.0)),  # spills off
    ]
    zones = zone_table(polys)
    res = (
        exact_extract_mixed(v, w, zones, ["mean", "weighted_mean", "weighted_sum"])
        .to_pandas()
        .sort_values("zone_id")
        .reset_index(drop=True)
    )

    # dense brute force on the common (=value) grid
    wr = ((np.arange(13) + 2) // 2)          # off_y = (16-13)/1... compute directly
    # global weight row for value row r: floor((y-center row) mapping) — do
    # it via coordinates instead: value cell (r,c) center -> weight indices
    ys = 13 - (np.arange(13) + 0.5)          # y center of value row r (ymax=13)
    xs = np.arange(17) + 0.5
    wrow = np.floor((wg.ymax - ys) / wg.dy).astype(int)
    wcol = np.floor((xs - wg.xmin) / wg.dx).astype(int)
    wmap = np.full((13, 17), np.nan)
    okr = (wrow >= 0) & (wrow < 7)
    okc = (wcol >= 0) & (wcol < 10)
    wmap[np.ix_(okr, okc)] = wts[np.ix_(wrow[okr], wcol[okc])]

    for i, (zid, _, wkb) in enumerate(polys):
        cov = coverage_fraction_wkb(vg, wkb).reshape(13, 17)
        m = cov > 0
        exp_mean = (vals[m] * cov[m]).sum() / cov[m].sum()
        exp_wsum = (vals[m] * cov[m] * wmap[m]).sum()
        exp_wmean = exp_wsum / (cov[m] * wmap[m]).sum()
        row = res[res["zone_id"] == zid].iloc[0]
        assert row["mean"] == pytest.approx(exp_mean, rel=1e-12), zid
        if np.isnan(exp_wmean):
            assert np.isnan(row["weighted_mean"]), zid
        else:
            assert row["weighted_mean"] == pytest.approx(exp_wmean, rel=1e-12), zid
            assert row["weighted_sum"] == pytest.approx(exp_wsum, rel=1e-12), zid
