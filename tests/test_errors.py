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
