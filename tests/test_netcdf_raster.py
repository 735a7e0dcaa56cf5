"""NetCDF classic raster source: round-trips, CF packing, orientation,
and zonal parity with the parquet-tile path.

Reference surface: GDAL's netCDF raster driver behind
gdal_raster_wrapper.cpp:22-95 (any GDAL band, including netCDF
subdatasets) and the netCDF block introspection helper
(R/exact_extract_helpers.R:388-431)."""

import numpy as np
import pytest

from exactextractr_ray import wkbio
from exactextractr_ray.grid import Grid
from exactextractr_ray.sources.netcdf_raster import (
    netcdf_raster_dataset,
    read_netcdf_raster,
    write_netcdf_raster,
)


def _sample():
    g = Grid(-10.0, 20.0, 22.0, 44.0, 0.5, 0.5)  # 64 x 48 cells
    rng = np.random.default_rng(3)
    a = rng.normal(size=(48, 64)) * 10
    a[5, 7] = np.nan
    return a, g


def test_netcdf_f8_roundtrip(tmp_path):
    a, g = _sample()
    p = str(tmp_path / "t.nc")
    write_netcdf_raster(a, g, p, nodata=-9999.0)
    r, gr = read_netcdf_raster(p)
    assert gr == g
    np.testing.assert_array_equal(np.isnan(r), np.isnan(a))
    np.testing.assert_allclose(r[~np.isnan(r)], a[~np.isnan(a)])


def test_netcdf_cf_packing(tmp_path):
    """scale_factor / add_offset CF packing into int16 with _FillValue."""
    a, g = _sample()
    p = str(tmp_path / "t.nc")
    write_netcdf_raster(
        a, g, p, nodata=-9999.0, dtype="i2", scale_factor=0.01, add_offset=5.0
    )
    r, gr = read_netcdf_raster(p)
    assert gr == g
    np.testing.assert_array_equal(np.isnan(r), np.isnan(a))
    np.testing.assert_allclose(r[~np.isnan(r)], a[~np.isnan(a)], atol=0.0051)


def test_netcdf_ascending_latitude_normalized(tmp_path):
    """CF-style south-up storage reads back row-0-north identically."""
    a, g = _sample()
    p1, p2 = str(tmp_path / "n.nc"), str(tmp_path / "s.nc")
    write_netcdf_raster(a, g, p1, nodata=-9999.0)
    write_netcdf_raster(a, g, p2, nodata=-9999.0, y_ascending=True)
    r1, g1 = read_netcdf_raster(p1)
    r2, g2 = read_netcdf_raster(p2)
    assert g1 == g2 == g
    np.testing.assert_array_equal(np.isnan(r1), np.isnan(r2))
    np.testing.assert_array_equal(r1[~np.isnan(r1)], r2[~np.isnan(r2)])


def test_netcdf_zonal_parity_with_array_path(ray_session, tmp_path):
    """exact_extract over a netCDF-sourced raster Dataset matches the
    direct in-memory array path bit-exactly."""
    from exactextractr_ray.pipelines.zonal import exact_extract
    from exactextractr_ray.sources.raster import raster_from_array
    from exactextractr_ray.sources.zones import zone_table

    a, g = _sample()
    p = str(tmp_path / "t.nc")
    write_netcdf_raster(a, g, p, nodata=-9999.0)

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
        netcdf_raster_dataset(p, tile=16), zones, ["count", "sum", "mean"]
    ).to_pandas()
    for c in ("count", "sum", "mean"):
        np.testing.assert_array_equal(got[c].to_numpy(), base[c].to_numpy())


def test_netcdf_rejects_non2d(tmp_path):
    a, g = _sample()
    p = str(tmp_path / "t.nc")
    write_netcdf_raster(a, g, p)
    with pytest.raises(ValueError, match="not 2-D"):
        read_netcdf_raster(p, var="x")


def test_netcdf_cdf2_roundtrip(tmp_path):
    """CDF-2 (64-bit offset) container: magic byte 2, u64 variable begins,
    identical data round-trip."""
    a, g = _sample()
    p = str(tmp_path / "v2.nc")
    write_netcdf_raster(a, g, p, nodata=-9999.0, version=2)
    with open(p, "rb") as f:
        assert f.read(4) == b"CDF\x02"
    r, gr = read_netcdf_raster(p)
    assert gr == g
    np.testing.assert_array_equal(np.isnan(r), np.isnan(a))
    np.testing.assert_array_equal(r[~np.isnan(r)], a[~np.isnan(a)])
    with pytest.raises(ValueError, match="version"):
        write_netcdf_raster(a, g, p, version=3)


def test_netcdf_lazy_window_reads_match_full(tmp_path):
    """NetCdfRasterFile byte-range windows == full-read slices, for
    north-down, south-up (row-flip path), CDF-2 and CF-packed files."""
    from exactextractr_ray.sources.netcdf_raster import NetCdfRasterFile

    a, g = _sample()
    cases = [
        dict(nodata=-9999.0),
        dict(nodata=-9999.0, y_ascending=True),
        dict(nodata=-9999.0, version=2),
        dict(nodata=-9999.0, dtype="i2", scale_factor=0.01, add_offset=5.0),
    ]
    for i, kw in enumerate(cases):
        p = str(tmp_path / f"w{i}.nc")
        write_netcdf_raster(a, g, p, **kw)
        full, gf = read_netcdf_raster(p)
        with NetCdfRasterFile(p) as nf:
            assert nf.grid == gf == g
            for (r0, c0, h, w) in [(0, 0, 48, 64), (3, 5, 7, 11),
                                   (40, 50, 8, 14), (5, 7, 1, 1)]:
                win = nf.read_window(r0, c0, h, w)
                np.testing.assert_array_equal(
                    win, full[r0 : r0 + h, c0 : c0 + w]
                )


def test_netcdf_streaming_dataset_matches_array_tiles(ray_session, tmp_path):
    """The actor-pool streaming source yields tiles byte-identical to the
    in-memory array path (same schema, same cell values, ragged edges)."""
    from exactextractr_ray.sources.raster import raster_from_array

    a, g = _sample()
    p = str(tmp_path / "s.nc")
    write_netcdf_raster(a, g, p, nodata=-9999.0, y_ascending=True)
    want = (
        raster_from_array(np.asarray(a, np.float64), g, tile=20)
        .ds.to_pandas()
        .sort_values("tile_id")
        .reset_index(drop=True)
    )
    got = (
        netcdf_raster_dataset(p, tile=20, concurrency=(1, 2))
        .ds.to_pandas()
        .sort_values("tile_id")
        .reset_index(drop=True)
    )
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    for i in range(len(got)):
        np.testing.assert_array_equal(
            np.asarray(got["values"][i]), np.asarray(want["values"][i])
        )
        for c in ("tile_id", "row0", "col0", "th", "tw"):
            assert got[c][i] == want[c][i]
