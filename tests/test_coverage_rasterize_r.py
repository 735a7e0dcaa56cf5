"""Transcription of the reference's coverage_fraction and rasterize_polygons
R suites (/root/reference/tests/testthat/test_coverage_fraction.R,
test_rasterize.R, test_num_expected_args.R) onto the Ray pipelines."""

import struct

import numpy as np
import pytest

from exactextractr_ray import wkbio
from exactextractr_ray.grid import Grid
from exactextractr_ray.pipelines.coverage_tiles import coverage_fraction
from exactextractr_ray.pipelines.rasterize import rasterize_polygons
from exactextractr_ray.pipelines.zonal import _num_expected_args
from exactextractr_ray.sources.zones import zone_table


@pytest.fixture(scope="module")
def _ray(ray_session):
    return None


def _cov_matrix(ds, grid: Grid, zone_id=None) -> np.ndarray:
    """Reassemble a zone's full-grid coverage raster from the tile rows
    (uncovered tiles are implicitly 0 — the reference's 0-not-NA contract)."""
    m = np.zeros((grid.nrow, grid.ncol))
    for r in ds.to_pandas().itertuples():
        if zone_id is not None and r.zone_id != zone_id:
            continue
        m[r.row0 : r.row0 + r.th, r.col0 : r.col0 + r.tw] = np.asarray(
            r.coverage
        ).reshape(r.th, r.tw)
    return m


def _rasterize_matrix(ds, grid: Grid) -> np.ndarray:
    m = np.full((grid.nrow, grid.ncol), -1, dtype=np.int32)
    for r in ds.to_pandas().itertuples():
        m[r.row0 : r.row0 + r.th, r.col0 : r.col0 + r.tw] = np.asarray(
            r.zone_index, dtype=np.int32
        ).reshape(r.th, r.tw)
    return m


SQUARE_05_25 = wkbio.rect_wkb(0.5, 0.5, 2.5, 2.5)


def test_journey_3x3(_ray):
    # test_coverage_fraction.R:16-38 — the canonical 3x3 quarter matrix,
    # through the Ray pipeline (kernel-level golden lives in test_coverage)
    ds = coverage_fraction(
        zone_table([(1, "sq", SQUARE_05_25)]), Grid(0, 0, 3, 3, 1, 1), tile=3
    )
    np.testing.assert_allclose(
        _cov_matrix(ds, Grid(0, 0, 3, 3, 1, 1)),
        [[0.25, 0.5, 0.25], [0.5, 1.0, 0.5], [0.25, 0.5, 0.25]],
    )


def test_crop_limits_tiles_to_feature_extent(_ray):
    # test_coverage_fraction.R:40-70 — crop=TRUE confines output to the
    # feature envelope; values are 0 where uncovered, never NA/missing
    g = Grid(0, 0, 10, 10, 1, 1)
    ds = coverage_fraction(
        zone_table([(1, "sq", SQUARE_05_25)]), g, tile=2, crop=True
    )
    df = ds.to_pandas()
    # envelope (0.5,0.5)-(2.5,2.5) -> grid rows 7..9, cols 0..2 -> 2x2 tiles
    assert set(zip(df["row0"], df["col0"])) <= {(6, 0), (6, 2), (8, 0), (8, 2)}
    m = _cov_matrix(ds, g)
    assert not np.isnan(m).any()
    assert m.sum() == pytest.approx(4.0)  # 2x2 square area
    # everything outside the envelope is exactly 0
    assert m[:7, :].sum() == 0 and m[:, 3:].sum() == 0


UTM_QUAD = [
    (397199.680921053, 5541748.05921053),
    (402813.496710526, 5543125.03289474),
    (407103.299342105, 5537246.41447368),
    (398470.733552632, 5533962.86184211),
    (397199.680921053, 5541748.05921053),
]


def test_coverage_fractions_are_exact(_ray):
    # test_coverage_fraction.R:107-121 — sum(frac) * cell_area == st_area
    g = Grid(391000, 5520000, 419800, 5547400, 100, 100)
    ds = coverage_fraction(
        zone_table([(1, "q", wkbio.polygon_wkb(UTM_QUAD))]), g, tile=64
    )
    total = sum(
        float(np.sum(r.coverage)) for r in ds.to_pandas().itertuples()
    )
    xs = np.array([p[0] for p in UTM_QUAD])
    ys = np.array([p[1] for p in UTM_QUAD])
    shoelace = 0.5 * abs(np.sum(xs[:-1] * ys[1:] - xs[1:] * ys[:-1]))
    # f64 accumulation over ~5e6-magnitude coordinates: agree to 1e-9 rel
    assert total * 100.0 * 100.0 == pytest.approx(shoelace, rel=1e-9)


def _polygon_z_wkb(coords_xyz) -> bytes:
    """ISO WKB POLYGON Z (type 1003), little-endian."""
    buf = struct.pack("<BI", 1, 1003) + struct.pack("<I", 1)
    buf += struct.pack("<I", len(coords_xyz))
    for x, y, z in coords_xyz:
        buf += struct.pack("<ddd", x, y, z)
    return buf


def test_z_dimension_ignored(_ray):
    # test_coverage_fraction.R:161-170 (issue #26): POLYGON Z == POLYGON
    g = Grid(0, 0, 5, 5, 1, 1)
    tri2d = wkbio.polygon_wkb([(1, 1), (4, 1), (4, 4), (1, 1)])
    tri3d = _polygon_z_wkb([(1, 1, 0), (4, 1, 0), (4, 4, 0), (1, 1, 0)])
    m2 = _cov_matrix(coverage_fraction(zone_table([(1, "t", tri2d)]), g, tile=5), g)
    m3 = _cov_matrix(coverage_fraction(zone_table([(1, "t", tri3d)]), g, tile=5), g)
    assert m2.sum() > 0
    np.testing.assert_array_equal(m2, m3)


def _wkt_polygon(coords):
    return wkbio.polygon_wkb(coords)


def test_rasterize_tiebreak_golden(_ray):
    # test_rasterize.R:16-41 — greatest-coverage assignment, ties to the
    # first feature encountered
    zones = zone_table(
        [
            (1, "a", _wkt_polygon([(10, 0), (10, 5), (5, 5), (10, 0)])),
            (2, "b", _wkt_polygon(
                [(0, 0), (10, 0), (5, 5), (1, 10), (0, 10), (0, 0)]
            )),
            (3, "c", _wkt_polygon([(5, 5), (10, 5), (10, 10), (1, 10), (5, 5)])),
        ]
    )
    g = Grid(0, 0, 10, 10, 2, 2)
    m = _rasterize_matrix(rasterize_polygons(zones, g, tile=5), g)

    # point (9, 1): row floor((10-1)/2)=4, col floor(9/2)=4 — a tie between
    # features 1 and 2, goes to the first (index 0 -> id 1)
    assert m[4, 4] == 0
    # point (5, 5): center cell, all three touch; feature 2 covers most
    assert m[2, 2] == 1


def test_rasterize_disjoint_polygon_all_na(_ray):
    # test_rasterize.R:78-86 — a polygon far outside the raster: no error,
    # every cell NA (-1 in the index encoding)
    zones = zone_table(
        [(1, "far", wkbio.circle_wkb(500, 500, 3.5, segments=120))]
    )
    g = Grid(0, 0, 10, 10, 2, 2)
    m = _rasterize_matrix(rasterize_polygons(zones, g, tile=5), g)
    assert (m == -1).all()


def test_rasterize_partial_intersection(_ray):
    # test_rasterize.R:88-96 — polygon straddling the raster edge: no error,
    # the inside half is assigned
    zones = zone_table(
        [(1, "edge", wkbio.circle_wkb(10, 5, 3.5, segments=120))]
    )
    g = Grid(0, 0, 10, 10, 2, 2)
    m = _rasterize_matrix(rasterize_polygons(zones, g, tile=5), g)
    assert (m == 0).any() and (m == -1).any()


def test_num_expected_args_defaults():
    # test_num_expected_args.R — args with ANY default are excluded
    assert _num_expected_args(lambda df, w: None) == 2
    assert _num_expected_args(lambda df, weighted=True: None) == 1
    assert _num_expected_args(lambda df, weighted=None: None) == 1
