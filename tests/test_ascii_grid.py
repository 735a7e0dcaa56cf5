"""Arc/Info ASCII Grid source: round-trips, registration conventions,
and zonal parity with the array path (AAIGrid analog of the GDAL band
wrapper, gdal_raster_wrapper.cpp:22-95)."""

import numpy as np
import pytest

from exactextractr_ray import wkbio
from exactextractr_ray.grid import Grid
from exactextractr_ray.sources.ascii_grid import (
    ascii_grid_raster_dataset,
    read_ascii_grid,
    write_ascii_grid,
)


def _sample():
    g = Grid(-10.0, 20.0, 22.0, 44.0, 0.5, 0.5)
    rng = np.random.default_rng(4)
    a = rng.normal(size=(48, 64)) * 10
    a[7, 2] = np.nan
    return a, g


def test_asc_roundtrip(tmp_path):
    a, g = _sample()
    p = str(tmp_path / "t.asc")
    write_ascii_grid(a, g, p)
    r, gr = read_ascii_grid(p)
    assert gr == g
    np.testing.assert_array_equal(np.isnan(r), np.isnan(a))
    np.testing.assert_array_equal(r[~np.isnan(r)], a[~np.isnan(a)])


def test_asc_center_registration(tmp_path):
    """xllcenter/yllcenter headers shift by half a cell."""
    p = str(tmp_path / "c.asc")
    with open(p, "w") as f:
        f.write(
            "ncols 3\nnrows 2\nxllcenter 10.5\nyllcenter 20.5\ncellsize 1\n"
            "nodata_value -1\n1 2 3\n4 -1 6\n"
        )
    r, g = read_ascii_grid(p)
    assert g == Grid(10.0, 20.0, 13.0, 22.0, 1.0, 1.0)
    assert np.isnan(r[1, 1])
    assert r[0, 0] == 1.0 and r[1, 2] == 6.0


def test_asc_errors(tmp_path):
    a, g = _sample()
    with pytest.raises(ValueError, match="square cells"):
        write_ascii_grid(a, Grid(0, 0, 64, 96, 1.0, 2.0), str(tmp_path / "x.asc"))
    p = str(tmp_path / "bad.asc")
    with open(p, "w") as f:
        f.write("ncols 3\nnrows 2\nxllcorner 0\nyllcorner 0\ncellsize 1\n1 2\n")
    with pytest.raises(ValueError, match="expected 6"):
        read_ascii_grid(p)


def test_asc_zonal_parity(ray_session, tmp_path):
    from exactextractr_ray.pipelines.zonal import exact_extract
    from exactextractr_ray.sources.raster import raster_from_array
    from exactextractr_ray.sources.zones import zone_table

    a, g = _sample()
    p = str(tmp_path / "t.asc")
    write_ascii_grid(a, g, p)
    zones = zone_table(
        [
            (0, "a", wkbio.rect_wkb(-8.3, 22.1, 3.7, 31.9)),
            (1, "b", wkbio.rect_wkb(4.0, 32.0, 20.5, 43.5)),
        ]
    )
    base = exact_extract(
        raster_from_array(a, g, tile=16), zones, ["count", "sum", "mean"]
    ).to_pandas()
    got = exact_extract(
        ascii_grid_raster_dataset(p, tile=16), zones, ["count", "sum", "mean"]
    ).to_pandas()
    for c in ("count", "sum", "mean"):
        np.testing.assert_array_equal(got[c].to_numpy(), base[c].to_numpy())
