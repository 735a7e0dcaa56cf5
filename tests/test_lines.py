"""Linear-geometry zonal statistics: per-cell traversal lengths as coverage
(test_raster_cell_intersection.cpp:70-84; linear mode of
raster_cell_intersection)."""

import numpy as np
import pytest

from exactextractr_ray import wkbio
from exactextractr_ray.grid import Grid
from exactextractr_ray.pipelines.zonal import exact_extract
from exactextractr_ray.sources.raster import raster_from_array
from exactextractr_ray.sources.zones import zone_table


@pytest.fixture(scope="module")
def _ray(ray_session):
    return None


def test_line_zonal_stats(_ray):
    g = Grid(0, 0, 8, 8, 1, 1)
    vals = np.arange(64, dtype=float).reshape(8, 8)
    rd = raster_from_array(vals, g, tile=4)
    # horizontal line at y=5.5 from x=0.5 to x=6.5 -> row 2 (from top)
    zones = zone_table(
        [(0, "line", wkbio.linestring_wkb([(0.5, 5.5), (6.5, 5.5)]))]
    )
    res = exact_extract(rd, zones, ["count", "sum", "mean"]).to_pandas()
    # lengths: cells (2,0..6) get [0.5,1,1,1,1,1,0.5]
    lens = np.array([0.5, 1, 1, 1, 1, 1, 0.5])
    v = vals[2, 0:7]
    assert res["count"].iloc[0] == pytest.approx(lens.sum())
    assert res["sum"].iloc[0] == pytest.approx(np.sum(v * lens))
    assert res["mean"].iloc[0] == pytest.approx(np.sum(v * lens) / lens.sum())


def test_diagonal_line(_ray):
    g = Grid(0, 0, 4, 4, 1, 1)
    rd = raster_from_array(np.ones((4, 4)), g, tile=4)
    zones = zone_table([(0, "diag", wkbio.linestring_wkb([(0, 0), (4, 4)]))])
    res = exact_extract(rd, zones, ["count"]).to_pandas()
    assert res["count"].iloc[0] == pytest.approx(np.hypot(4, 4))


def test_mixed_geometry_rejected(_ray):
    import struct

    g = Grid(0, 0, 4, 4, 1, 1)
    rd = raster_from_array(np.ones((4, 4)), g, tile=4)
    inner = wkbio.rect_wkb(0, 0, 2, 2) + wkbio.linestring_wkb([(0, 0), (3, 3)])
    gc = struct.pack("<BII", 1, 7, 2) + inner
    zones = zone_table([(0, "mixed", gc)])
    with pytest.raises(Exception):
        exact_extract(rd, zones, ["count"])
