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
