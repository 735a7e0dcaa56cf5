"""Boundary-tracing golden matrices from the reference's Catch2 kernel suite
(/root/reference/src/exactextract/test/test_raster_cell_intersection.cpp)
not yet covered by tests/test_coverage.py — the cases where a polygon edge
starts on, follows, or bounces off a cell boundary, i.e. exactly where a
scanline kernel could plausibly diverge from the reference's traversal
kernel. Pure kernel tests — no Ray."""

import numpy as np
import pytest

from exactextractr_ray import wkbio
from exactextractr_ray.coverage import (
    coverage_fraction_wkb,
    length_matrix,
)
from exactextractr_ray.grid import Grid
from exactextractr_ray.wkbio import parse_wkb, polygon_parts

G3 = Grid(0, 0, 3, 3, 1, 1)


def cov(grid, wkb):
    return coverage_fraction_wkb(grid, wkb)


def P(*coords):
    return wkbio.polygon_wkb(list(coords) + [coords[0]])


def test_basic_non_rectangle():
    # test_raster_cell_intersection.cpp:118-133
    c = cov(G3, P((0.5, 0.5), (2.5, 0.5), (2.5, 2.0), (2.0, 2.0),
                  (2.0, 2.5), (0.5, 2.5)))
    np.testing.assert_allclose(
        c, [[0.25, 0.5, 0.00], [0.50, 1.0, 0.50], [0.25, 0.5, 0.25]]
    )


def test_diagonals_golden():
    # test_raster_cell_intersection.cpp:282-297
    c = cov(G3, P((1.5, 0.5), (2.5, 1.5), (1.5, 2.5), (0.5, 1.5)))
    np.testing.assert_allclose(
        c, [[0.00, 0.25, 0.00], [0.25, 1.00, 0.25], [0.00, 0.25, 0.00]]
    )


def test_starting_on_cell_boundary():
    # test_raster_cell_intersection.cpp:298-312 (Canada, 0.5-deg grid)
    g = Grid(0, 0, 2, 2, 1, 1)
    c = cov(g, P((1, 1.5), (1.5, 1.5), (1.5, 0.5), (0.5, 0.5), (0.5, 1.5)))
    np.testing.assert_allclose(c, [[0.25, 0.25], [0.25, 0.25]])


def test_bouncing_off_boundary():
    # test_raster_cell_intersection.cpp:314-329 (Trinidad and Tobago)
    g = Grid(0, -1, 2, 2, 1, 1)  # 3 rows x 2 cols
    c = cov(g, P((0.5, 1.5), (0.5, 0.5), (0.5, 0), (1.5, 0.5), (1.5, 1.5)))
    np.testing.assert_allclose(c[:2], [[0.25, 0.25], [0.4375, 0.3125]])
    assert c[2].sum() == 0


def test_bouncing_off_boundary_2():
    # test_raster_cell_intersection.cpp:330-340 — must not throw
    g = Grid(0, 0, 2, 2, 1, 1)
    c = cov(g, P((0.5, 0.5), (1.5, 0.5), (1.5, 1.5), (0.5, 1.5), (1, 1.2)))
    assert np.isfinite(c).all()


def test_follows_grid_boundary():
    # test_raster_cell_intersection.cpp:341-358 (Libya-Egypt border)
    c = cov(G3, P((0.5, 0.5), (2, 0.5), (2, 1.5), (2, 2.5), (0.5, 2.5)))
    np.testing.assert_allclose(
        c, [[0.25, 0.5, 0], [0.50, 1.0, 0], [0.25, 0.5, 0]]
    )


def test_starts_on_vertical_boundary_moving_up():
    # test_raster_cell_intersection.cpp:359-374
    g = Grid(0, 0, 3, 4, 1, 1)  # 4 rows x 3 cols
    c = cov(g, P((3, 0.5), (3, 2.5), (0.5, 2.5), (0.5, 0.5)))
    np.testing.assert_allclose(
        c[1:], [[0.25, 0.5, 0.5], [0.50, 1.0, 1.0], [0.25, 0.5, 0.5]]
    )
    assert c[0].sum() == 0


def test_starts_on_vertical_boundary_moving_down():
    # test_raster_cell_intersection.cpp:375-390
    g = Grid(0, 0, 3, 4, 1, 1)
    c = cov(g, P((0.5, 2.5), (0.5, 0.5), (3, 0.5), (3, 2.5)))
    np.testing.assert_allclose(
        c[1:], [[0.25, 0.5, 0.5], [0.50, 1.0, 1.0], [0.25, 0.5, 0.5]]
    )


def test_starts_on_vertical_boundary_rightmost():
    # test_raster_cell_intersection.cpp:391-406 — edge exactly on the grid's
    # right wall
    c = cov(G3, P((3, 2.5), (3, 0.5), (0.5, 0.5), (0.5, 2.5)))
    np.testing.assert_allclose(
        c, [[0.25, 0.5, 0.5], [0.50, 1.0, 1.0], [0.25, 0.5, 0.5]]
    )


def test_starts_on_horizontal_boundary_moving_right():
    # test_raster_cell_intersection.cpp:407-422
    g = Grid(0, 0, 3, 4, 1, 1)  # 4 rows x 3 cols (reference's "3x4 grid")
    c = cov(g, P((0.5, 1), (2.5, 1), (2.5, 3.5), (0.5, 3.5)))
    np.testing.assert_allclose(
        c[:3],
        [[0.25, 0.5, 0.25], [0.50, 1.0, 0.50], [0.50, 1.0, 0.50]],
    )
    assert c[3].sum() == 0


def test_starts_on_horizontal_boundary_moving_left():
    # test_raster_cell_intersection.cpp:423-439
    g = Grid(0, 0, 3, 4, 1, 1)
    c = cov(g, P((2.5, 3), (0.5, 3), (0.5, 3.5), (0.25, 3.5), (0.25, 0.5),
                 (2.5, 0.5)))
    np.testing.assert_allclose(
        c,
        [
            [0.125, 0.00, 0.00],
            [0.750, 1.00, 0.50],
            [0.750, 1.00, 0.50],
            [0.375, 0.50, 0.25],
        ],
    )


def test_geometry_extent_larger_than_raster_tiles():
    # test_raster_cell_intersection.cpp:193-249 — a geometry spanning four
    # 3x3 tiles, each tile computed independently
    wkb = P((0.5, 0.5), (4.5, 0.5), (4.5, 5.5), (0.5, 5.5))
    ll = cov(Grid(0, 0, 3, 3, 1, 1), wkb)
    np.testing.assert_allclose(
        ll, [[0.50, 1.0, 1.0], [0.50, 1.0, 1.0], [0.25, 0.5, 0.5]]
    )
    lr = cov(Grid(3, 0, 6, 3, 1, 1), wkb)
    np.testing.assert_allclose(
        lr[:, :2], [[1.00, 0.50], [1.00, 0.50], [0.50, 0.25]]
    )
    ur = cov(Grid(3, 3, 6, 6, 1, 1), wkb)
    np.testing.assert_allclose(
        ur[:, :2], [[0.50, 0.25], [1.00, 0.50], [1.00, 0.50]]
    )
    ul = cov(Grid(0, 3, 3, 6, 1, 1), wkb)
    np.testing.assert_allclose(
        ul, [[0.25, 0.5, 0.5], [0.50, 1.0, 1.0], [0.50, 1.0, 1.0]]
    )


def test_detached_inner_ring_outside_raster():
    # test_raster_cell_intersection.cpp:269-281 — an (invalid) hole fully
    # outside the grid must not corrupt the shell's coverage
    diamond = P((1.5, 0.5), (2.5, 1.5), (1.5, 2.5), (0.5, 1.5))
    with_hole = wkbio.polygon_wkb(
        [(1.5, 0.5), (2.5, 1.5), (1.5, 2.5), (0.5, 1.5), (1.5, 0.5)],
        holes=[[(100, 100), (100, 101), (101, 101), (100, 100)]],
    )
    np.testing.assert_allclose(cov(G3, with_hole), cov(G3, diamond))


def test_fiji_regression():
    # test_raster_cell_intersection.cpp:440-451 — antimeridian-touching
    # multipolygon whose rightmost edge lands exactly on a cell wall
    g = Grid(-180.5, -90.5, 180.5, 90.5, 0.5, 0.5)
    wkb = wkbio.multipolygon_wkb([
        ([(178.3736000000001, -17.33992000000002),
          (178.71806000000007, -17.62845999999996),
          (178.5527099999999, -18.150590000000008),
          (177.93266000000008, -18.287990000000036),
          (177.38145999999992, -18.164319999999975),
          (177.28504000000007, -17.72464999999997),
          (177.67087, -17.381139999999974),
          (178.12557000000007, -17.50480999999995),
          (178.3736000000001, -17.33992000000002)], []),
        ([(179.36414266196417, -16.801354076946836),
          (178.7250593629972, -17.012041674368007),
          (178.5968385951172, -16.63915000000003),
          (179.0966093629972, -16.43398427754741),
          (179.4135093629972, -16.379054277547382),
          (180.00000000000003, -16.06713266364241),
          (180.00000000000003, -16.555216566639146),
          (179.36414266196417, -16.801354076946836)], []),
        ([(-179.91736938476527, -16.501783135649347),
          (-179.99999999999997, -16.555216566639146),
          (-179.99999999999997, -16.06713266364241),
          (-179.79332010904858, -16.020882256741217),
          (-179.91736938476527, -16.501783135649347)], []),
    ])
    c = cov(g, wkb)
    assert np.isfinite(c).all() and c.sum() > 0


def test_small_polygon_single_cell():
    # test_raster_cell_intersection.cpp:452-463 — one 10x10 cell
    g = Grid(0, 0, 10, 10, 10, 10)
    c = cov(g, P((3, 3), (4, 3), (4, 4), (3, 4)))
    np.testing.assert_allclose(c, [[0.01]])


def test_small_polygon_optimization():
    # test_raster_cell_intersection.cpp:134-153 — tiny triangle inside one
    # cell: only that cell nonzero, value = triangle area
    c = cov(G3, P((0.5, 0.5), (0.6, 0.5), (0.6, 0.6)))
    assert c[2, 0] == pytest.approx(0.005)
    c[2, 0] = 0
    assert c.sum() == 0


def test_small_line_optimization():
    # test_raster_cell_intersection.cpp:155-176 — tiny closed line inside
    # one cell: per-cell length = full line length
    wkb = wkbio.linestring_wkb(
        [(0.5, 0.5), (0.6, 0.5), (0.6, 0.6), (0.5, 0.5)]
    )
    m = length_matrix(G3, parse_wkb(wkb))
    exp = 0.1 + 0.1 + np.hypot(0.1, 0.1)
    assert m[2, 0] == pytest.approx(exp)
    m[2, 0] = 0
    assert m.sum() == 0


def test_fill_handled_correctly():
    # test_raster_cell_intersection.cpp:464-481 — a spiral whose interior
    # fill state changes mid-row
    g = Grid(0, 0, 3, 5, 1, 1)  # 5 rows x 3 cols
    c = cov(g, P((0.5, 0.2), (2.2, 0.2), (2.2, 0.4), (0.7, 0.4), (0.7, 2.2),
                 (2.2, 2.2), (2.2, 0.6), (2.4, 0.6), (2.4, 4.8), (0.5, 4.8)))
    np.testing.assert_allclose(
        c,
        [
            [0.40, 0.80, 0.32],
            [0.50, 1.00, 0.40],
            [0.44, 0.80, 0.36],
            [0.20, 0.00, 0.20],
            [0.22, 0.20, 0.12],
        ],
    )


def test_result_indexing_nonsquare_resolution():
    # test_raster_cell_intersection.cpp:482-510 — dx != dy, offsets into a
    # large parent grid
    g = Grid(-20, -15, 40, 30, 0.5, 1)
    c = cov(g, P((0.25, 0.20), (2.75, 0.20), (2.75, 4.5), (0.25, 4.5)))
    rr, cc = np.nonzero(c)
    # nonzero region: 5 rows x 6 cols, offset (25, 40) from the grid origin
    assert rr.min() == 25 and cc.min() == 40
    sub = c[25:30, 40:46]
    np.testing.assert_allclose(
        sub,
        [
            [0.25, 0.50, 0.50, 0.50, 0.50, 0.25],
            [0.50, 1.00, 1.00, 1.00, 1.00, 0.50],
            [0.50, 1.00, 1.00, 1.00, 1.00, 0.50],
            [0.50, 1.00, 1.00, 1.00, 1.00, 0.50],
            [0.40, 0.80, 0.80, 0.80, 0.80, 0.40],
        ],
    )
    c[25:30, 40:46] = 0
    assert c.sum() == 0
