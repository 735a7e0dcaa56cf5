"""ENVI raster source: interleaves, dtypes, georeferencing, band select,
zonal parity (AAIGrid/ENVI analog of the GDAL band wrapper,
gdal_raster_wrapper.cpp:22-95)."""

import numpy as np
import pytest

from exactextractr_ray import wkbio
from exactextractr_ray.grid import Grid
from exactextractr_ray.sources.envi import (
    envi_raster_dataset,
    read_envi,
    write_envi,
)


def _sample():
    g = Grid(-10.0, 20.0, 22.0, 44.0, 0.5, 0.5)
    rng = np.random.default_rng(5)
    a = rng.normal(size=(48, 64)) * 10
    a[5, 7] = np.nan
    return a, g


@pytest.mark.parametrize("interleave", ["bsq", "bil", "bip"])
def test_envi_roundtrip_interleaves(tmp_path, interleave):
    a, g = _sample()
    p = str(tmp_path / "t.img")
    write_envi(a, g, p, nodata=-9999.0, interleave=interleave)
    r, gr = read_envi(p)
    assert gr == g
    np.testing.assert_array_equal(np.isnan(r), np.isnan(a))
    np.testing.assert_array_equal(r[~np.isnan(r)], a[~np.isnan(a)])


@pytest.mark.parametrize("interleave", ["bsq", "bil", "bip"])
def test_envi_multiband_band_select(tmp_path, interleave):
    _, g = _sample()
    rng = np.random.default_rng(6)
    mb = rng.normal(size=(48, 64, 3)).astype(np.float32)
    p = str(tmp_path / "m.img")
    write_envi(mb, g, p, interleave=interleave, dtype="f4")
    for b in (1, 2, 3):
        r, _ = read_envi(p, band=b)
        np.testing.assert_array_equal(r, mb[:, :, b - 1].astype(np.float64))
    with pytest.raises(ValueError, match="band 4 out of range"):
        read_envi(p, band=4)


def test_envi_zonal_parity(ray_session, tmp_path):
    from exactextractr_ray.pipelines.zonal import exact_extract
    from exactextractr_ray.sources.raster import raster_from_array
    from exactextractr_ray.sources.zones import zone_table

    a, g = _sample()
    p = str(tmp_path / "t.img")
    write_envi(a, g, p, nodata=-9999.0)
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
        envi_raster_dataset(p, tile=16), zones, ["count", "sum", "mean"]
    ).to_pandas()
    for c in ("count", "sum", "mean"):
        np.testing.assert_array_equal(got[c].to_numpy(), base[c].to_numpy())
