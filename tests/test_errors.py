"""Error-path contracts, mirroring the reference's error tests
(/root/reference/tests/testthat/test_exact_extract_errors.R)."""

import numpy as np
import pytest

from exactextractr_ray import wkbio
from exactextractr_ray.grid import Grid
from exactextractr_ray.sources.raster import raster_from_array
from exactextractr_ray.sources.zones import zone_table
from exactextractr_ray.stats import RasterStats


@pytest.fixture(scope="module")
def _ray(ray_session):
    return None


def _rd(n=4):
    return raster_from_array(np.ones((n, n)), Grid(0, 0, n, n, 1, 1), tile=n)


def _zones():
    return zone_table([(0, "z", wkbio.rect_wkb(0, 0, 2, 2))])


def test_weighted_stat_requires_weights(_ray):
    from exactextractr_ray.pipelines.zonal import exact_extract

    with pytest.raises(ValueError, match="weight"):
        exact_extract(_rd(), _zones(), ["weighted_mean"])


def test_unknown_stat_rejected(_ray):
    from exactextractr_ray.pipelines.zonal import exact_extract

    with pytest.raises(Exception):
        exact_extract(_rd(), _zones(), ["bogus_stat"])


def test_bad_recycle_rejected():
    from exactextractr_ray.pipelines.zonal import value_weight_indexes

    with pytest.raises(ValueError, match="n/n"):
        value_weight_indexes(2, 3)


def test_quantile_range():
    st = RasterStats(store_values=True)
    st.process(np.array([1.0]), np.array([1.0]))
    for q in (-0.1, 1.5, float("nan")):
        with pytest.raises(ValueError):
            st.quantile(q)


def test_unsupported_wkb_geometry():
    import struct

    with pytest.raises(ValueError, match="unsupported"):
        wkbio.parse_wkb(struct.pack("<BI", 1, 99))


def test_unsupported_wkt_type():
    with pytest.raises(ValueError, match="unsupported"):
        wkbio.parse_wkt("CIRCULARSTRING (0 0, 1 1, 2 0)")


def test_stat_descriptor_errors():
    from exactextractr_ray.plan import parse_stat_descriptor

    with pytest.raises(ValueError):
        parse_stat_descriptor("x=mean(a,b,c)")
    with pytest.raises(ValueError):
        parse_stat_descriptor("not a descriptor!!")


def test_missing_weight_layer_in_block(_ray):
    from exactextractr_ray.pipelines.zonal import exact_extract

    with pytest.raises(Exception, match="layer|weight"):
        exact_extract(_rd(), _zones(), ["weighted_mean"], weight_layer="nope")


def test_max_cells_validation(_ray):
    """Transcribed: test_exact_extract_errors.R:241-258 (Invalid max_cells /
    must be a single numeric)."""
    from exactextractr_ray.pipelines.zonal import exact_extract
    from exactextractr_ray.sources.raster import synthetic_raster_dataset
    from exactextractr_ray.sources.zones import synth_rect_zones

    rd = synthetic_raster_dataset(n=16, tile=8)
    zones = synth_rect_zones(2, 16)
    with pytest.raises(ValueError, match="Invalid max_cells"):
        exact_extract(rd, zones, ["mean"], max_cells_per_item=-123)
    with pytest.raises(ValueError, match="single integer"):
        exact_extract(rd, zones, ["mean"], max_cells_per_item=1.5)


def test_incompatible_weight_grid(_ray):
    """Transcribed: test_exact_extract_errors.R:172 (Incompatible extents /
    non-multiple resolutions between value and weight rasters)."""
    import numpy as np
    from exactextractr_ray.grid import Grid
    from exactextractr_ray.pipelines.mixed import exact_extract_mixed
    from exactextractr_ray.sources.raster import raster_from_array
    from exactextractr_ray.sources.zones import synth_rect_zones

    g1 = Grid(0, 0, 16, 16, 1, 1)
    g2 = Grid(0.3, 0, 16.3, 16, 1.7, 1.7)  # misaligned, non-multiple
    v = raster_from_array(np.ones((16, 16)), g1, tile=8)
    w = raster_from_array(np.ones((10, 10)), g2, tile=8)
    with pytest.raises(ValueError, match="not compatible"):
        exact_extract_mixed(v, w, synth_rect_zones(2, 16), ["weighted_mean"])


def test_quantile_argument_contract(_ray):
    # test_exact_extract_errors.R:338-354
    from exactextractr_ray.pipelines.zonal import exact_extract
    from exactextractr_ray.sources.raster import synthetic_raster_dataset
    from exactextractr_ray.sources.zones import synth_rect_zones

    rd = synthetic_raster_dataset(n=16, tile=8)
    zones = synth_rect_zones(1, 16)
    with pytest.raises(ValueError, match="Quantiles not specified"):
        exact_extract(rd, zones, ["quantile"])
    with pytest.raises(ValueError, match="Quantiles not specified"):
        exact_extract(rd, zones, ["quantile"], quantiles=[])
    with pytest.raises(ValueError, match="between 0 and 1"):
        exact_extract(rd, zones, ["quantile"], quantiles=[float("nan")])
    with pytest.raises(ValueError, match="between 0 and 1"):
        exact_extract(rd, zones, ["quantile"], quantiles=[0.5, 1.1])


def test_stats_argument_contract(_ray):
    # test_exact_extract_errors.R:214-222, 473-494
    from exactextractr_ray.pipelines.zonal import (
        exact_extract,
        exact_extract_apply,
    )
    from exactextractr_ray.sources.raster import synthetic_raster_dataset
    from exactextractr_ray.sources.zones import synth_rect_zones

    rd = synthetic_raster_dataset(n=16, tile=8)
    zones = synth_rect_zones(1, 16)
    with pytest.raises(ValueError, match="No summary operations"):
        exact_extract(rd, zones, [])
    with pytest.raises(ValueError, match="character vector, function"):
        exact_extract(rd, zones, [44])
    with pytest.raises(ValueError, match="character vector, function"):
        exact_extract_apply(rd, zones, 44)
    # a bare string stat is accepted as a single op (R vector semantics)
    out = exact_extract(rd, zones, "count").to_pandas() if hasattr(
        exact_extract(rd, zones, "count"), "to_pandas"
    ) else exact_extract(rd, zones, "count")
    assert "count" in out.columns


def test_unused_weights_warning(_ray):
    # test_exact_extract_errors.R:28-37
    import warnings

    from exactextractr_ray.pipelines.zonal import exact_extract
    from exactextractr_ray.sources.raster import synthetic_raster_dataset
    from exactextractr_ray.sources.zones import synth_rect_zones

    rd = synthetic_raster_dataset(n=16, tile=8, layers=("value", "weight"))
    zones = synth_rect_zones(1, 16)
    with pytest.warns(UserWarning, match="Weights provided but no"):
        exact_extract(rd, zones, ["count", "sum"], weight_layer="weight")
    # no warning when a weighted stat uses them
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        exact_extract(rd, zones, ["weighted_mean"], weight_layer="weight")


def test_scalar_default_value_contract(_ray):
    # test_exact_extract_errors.R:495-520
    from exactextractr_ray.pipelines.zonal import exact_extract
    from exactextractr_ray.sources.raster import synthetic_raster_dataset
    from exactextractr_ray.sources.zones import synth_rect_zones

    rd = synthetic_raster_dataset(n=16, tile=8)
    zones = synth_rect_zones(1, 16)
    with pytest.raises(ValueError, match="single numeric"):
        exact_extract(rd, zones, ["sum"], default_value=[1.0, 2.0])
    with pytest.raises(ValueError, match="single numeric"):
        exact_extract(rd, zones, ["sum"], default_value=True)


def test_disaggregation_warning(_ray):
    # test_exact_extract_errors.R:355-372 — warn only when the VALUE raster
    # must be disaggregated to the weights' finer resolution
    import warnings

    import numpy as np

    from exactextractr_ray.grid import Grid
    from exactextractr_ray.pipelines.mixed import exact_extract_mixed
    from exactextractr_ray.sources.raster import raster_from_array
    from exactextractr_ray.sources.zones import zone_table
    from exactextractr_ray import wkbio

    coarse = raster_from_array(
        np.arange(16.0).reshape(4, 4), Grid(0, 0, 8, 8, 2, 2), tile=4
    )
    fine = raster_from_array(
        np.arange(64.0).reshape(8, 8), Grid(0, 0, 8, 8, 1, 1), tile=4
    )
    zones = zone_table([(1, "z", wkbio.rect_wkb(1, 1, 7, 7))])

    with pytest.warns(UserWarning, match="disaggregated"):
        exact_extract_mixed(coarse, fine, zones, ["weighted_mean"])
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        exact_extract_mixed(fine, coarse, zones, ["weighted_mean"])
