"""Golden coverage-fraction tests transcribed from the reference's Catch2
suite (/root/reference/src/exactextract/test/test_raster_cell_intersection.cpp)
and R testthat suite. Pure kernel tests — no Ray."""

import numpy as np
import pytest

from exactextractr_ray import wkbio
from exactextractr_ray.coverage import (
    coverage_fraction_wkb,
    coverage_matrix,
    length_matrix,
)
from exactextractr_ray.grid import Box, Grid

G3 = Grid(0, 0, 3, 3, 1, 1)


def cov(grid, wkb):
    return coverage_fraction_wkb(grid, wkb)


def test_canonical_unit_square():
    # test_raster_cell_intersection.cpp:49-68
    c = cov(G3, wkbio.rect_wkb(0.5, 0.5, 2.5, 2.5))
    np.testing.assert_array_equal(
        c, [[0.25, 0.5, 0.25], [0.5, 1.0, 0.5], [0.25, 0.5, 0.25]]
    )


def test_full_cover_and_beyond_extent():
    # polygon extending beyond the raster is clipped (test_exact_extract.R:270-289)
    c = cov(G3, wkbio.rect_wkb(-5, -5, 8, 9))
    np.testing.assert_array_equal(c, np.ones((3, 3)))


def test_polygon_with_hole():
    wkb = wkbio.polygon_wkb(
        [(0, 0), (3, 0), (3, 3), (0, 3), (0, 0)],
        holes=[[(1, 1), (2, 1), (2, 2), (1, 2), (1, 1)]],
    )
    c = cov(G3, wkb)
    expected = np.ones((3, 3))
    expected[1, 1] = 0.0
    np.testing.assert_array_equal(c, expected)


def test_hole_partial_cells():
    wkb = wkbio.polygon_wkb(
        [(0, 0), (3, 0), (3, 3), (0, 3), (0, 0)],
        holes=[[(0.5, 0.5), (2.5, 0.5), (2.5, 2.5), (0.5, 2.5), (0.5, 0.5)]],
    )
    c = cov(G3, wkb)
    np.testing.assert_allclose(
        c, 1.0 - np.array([[0.25, 0.5, 0.25], [0.5, 1.0, 0.5], [0.25, 0.5, 0.25]])
    )


def test_triangle():
    c = cov(G3, wkbio.polygon_wkb([(0, 0), (1, 0), (0, 1), (0, 0)]))
    assert c[2, 0] == 0.5
    assert c.sum() == pytest.approx(0.5)


def test_multipolygon_disjoint_squares():
    # test_exact_extract.R:199-222 — multipolygon of two disjoint parts
    wkb = wkbio.multipolygon_wkb(
        [
            ([(0, 0), (1, 0), (1, 1), (0, 1), (0, 0)], []),
            ([(2, 2), (3, 2), (3, 3), (2, 3), (2, 2)], []),
        ]
    )
    c = cov(G3, wkb)
    expected = np.zeros((3, 3))
    expected[2, 0] = 1.0  # (0..1)^2 is the bottom-left cell -> row 2
    expected[0, 2] = 1.0
    np.testing.assert_array_equal(c, expected)


def test_self_overlapping_multipolygon_exceeds_one():
    # documented behavior: coverage may exceed 1 for self-overlapping
    # multipolygons (R/exact_extract.R:29-31)
    wkb = wkbio.multipolygon_wkb(
        [
            ([(0, 0), (3, 0), (3, 3), (0, 3), (0, 0)], []),
            ([(1, 1), (2, 1), (2, 2), (1, 2), (1, 1)], []),
        ]
    )
    c = cov(G3, wkb)
    assert c[1, 1] == 2.0


def test_geometry_collection_flattened():
    import struct

    inner = wkbio.rect_wkb(0, 0, 1, 1) + wkbio.rect_wkb(2, 2, 3, 3)
    gc = struct.pack("<BII", 1, 7, 2) + inner
    c = coverage_matrix(G3, wkbio.parse_wkb(gc))
    assert c[2, 0] == 1.0 and c[0, 2] == 1.0


def test_cw_shell_normalized():
    # shell given clockwise must still produce positive coverage
    wkb = wkbio.polygon_wkb([(0, 0), (0, 3), (3, 3), (3, 0), (0, 0)])
    c = cov(G3, wkb)
    np.testing.assert_array_equal(c, np.ones((3, 3)))


def test_diagonal_edges():
    # diamond inscribed in the grid
    wkb = wkbio.polygon_wkb([(1.5, 0), (3, 1.5), (1.5, 3), (0, 1.5), (1.5, 0)])
    c = cov(G3, wkb)
    assert c.sum() == pytest.approx(4.5)  # diamond area = d1*d2/2 = 3*3/2
    assert c[1, 1] == 1.0
    assert c[0, 0] == pytest.approx(0.125)
    np.testing.assert_allclose(c, c.T)  # symmetric
    np.testing.assert_allclose(c, c[::-1, ::-1])


def test_polygon_fully_outside_grid():
    c = cov(G3, wkbio.rect_wkb(10, 10, 12, 12))
    np.testing.assert_array_equal(c, np.zeros((3, 3)))


def test_polygon_smaller_than_cell():
    c = cov(G3, wkbio.rect_wkb(1.25, 1.25, 1.75, 1.75))
    assert c[1, 1] == pytest.approx(0.25)
    assert c.sum() == pytest.approx(0.25)


def test_edges_on_cell_boundaries():
    # polygon boundary exactly on grid lines
    c = cov(G3, wkbio.rect_wkb(1, 1, 2, 2))
    expected = np.zeros((3, 3))
    expected[1, 1] = 1.0
    np.testing.assert_array_equal(c, expected)


def test_tile_consistency():
    """Same polygon over 4 adjacent subgrids sums to the whole
    (test_raster_cell_intersection.cpp:193-248)."""
    rng = np.random.default_rng(42)
    pts = rng.uniform(0.2, 2.8, size=(7, 2))
    # close a star-ish simple polygon by angle sort around centroid
    ctr = pts.mean(axis=0)
    ang = np.arctan2(pts[:, 1] - ctr[1], pts[:, 0] - ctr[0])
    ring = pts[np.argsort(ang)]
    wkb = wkbio.polygon_wkb(np.vstack([ring, ring[:1]]))

    g = Grid(0, 0, 4, 4, 0.5, 0.5)  # 8x8
    whole = cov(g, wkb)
    merged = np.zeros((8, 8))
    for r0, c0 in [(0, 0), (0, 4), (4, 0), (4, 4)]:
        sub = g.subgrid(r0, c0, 4, 4)
        merged[r0 : r0 + 4, c0 : c0 + 4] = cov(sub, wkb)
    np.testing.assert_allclose(merged, whole, atol=1e-12)


def test_fine_grid_area_conservation():
    wkb = wkbio.circle_wkb(5, 5, 3, segments=30)
    g = Grid(0, 0, 10, 10, 0.1, 0.1)
    c = cov(g, wkb)
    parts = wkbio.parse_wkb(wkb)
    true_area = wkbio.ring_area_signed(parts[0]["rings"][0])
    assert c.sum() * 0.01 == pytest.approx(true_area, rel=1e-12)
    assert c.min() >= 0.0 and c.max() <= 1.0 + 1e-12


def test_line_length():
    # test_raster_cell_intersection.cpp:70-84 — per-cell traversal lengths
    m = length_matrix(G3, wkbio.parse_wkb(wkbio.linestring_wkb([(0.5, 0.5), (2.5, 0.5)])))
    np.testing.assert_allclose(m[2], [0.5, 1.0, 0.5])
    assert m[:2].sum() == 0


def test_line_diagonal_length():
    m = length_matrix(G3, wkbio.parse_wkb(wkbio.linestring_wkb([(0, 0), (3, 3)])))
    assert m.sum() == pytest.approx(np.hypot(3, 3))
    np.testing.assert_allclose(np.diag(m[::-1]), np.sqrt(2))


def test_grid_crop_and_offsets():
    g = Grid(0, 0, 10, 10, 1, 1)
    sub = g.crop_to_box(Box(2.3, 3.7, 5.1, 6.2))
    assert (sub.xmin, sub.ymin, sub.xmax, sub.ymax) == (2, 3, 6, 7)
    assert sub.row_offset(g) == 3 and sub.col_offset(g) == 2
    # crop exactly on boundaries does not add cells
    sub2 = g.crop_to_box(Box(2.0, 3.0, 5.0, 6.0))
    assert (sub2.ncol, sub2.nrow) == (3, 3)


def test_grid_subdivide_covers_all():
    g = Grid(0, 0, 7, 5, 1, 1)
    subs = list(g.subdivide(11))
    assert sum(s.ncell for s in subs) == g.ncell
    for s in subs:
        assert s.ncell <= 11


def test_subgrid_coverage_equals_slice():
    wkb = wkbio.circle_wkb(3, 3, 2.2, segments=24)
    g = Grid(0, 0, 6, 6, 0.5, 0.5)
    whole = cov(g, wkb)
    sub = g.subgrid(2, 3, 5, 4)
    np.testing.assert_allclose(cov(sub, wkb), whole[2:7, 3:7], atol=1e-12)
