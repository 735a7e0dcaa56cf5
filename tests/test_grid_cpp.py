"""Transcription of the reference's C++ grid-algebra suite
(/root/reference/src/exactextract/test/test_grid.cpp) onto
exactextractr_ray.grid.Grid (bounded-extent semantics; the reference's
infinite-extent padding rows are an implementation detail of its traversal
kernel, subsumed by the scanline design here). Pure kernel tests — no Ray."""

import math

import pytest

from exactextractr_ray.grid import Box, Grid

GLOBAL = Grid(-180, -90, 180, 90, 0.5, 0.5)


def test_dimensions():
    # test_grid.cpp:25-37
    assert GLOBAL.nrow == 360 and GLOBAL.ncol == 720
    g = Grid(8.5, 1.6, 16.2, 13.1, 0.1, 0.1)
    assert g.ncol == 77 and g.nrow == 115


def test_index_lookups():
    # test_grid.cpp:60-79 (bounded; out-of-range clamps here rather than
    # throwing — the streaming kernel never indexes outside a tile)
    g = Grid(-180, -90, 180, 90, 1.0, 0.5)
    assert g.row_for_y(90) == 0
    assert g.row_for_y(-89.50000001) == 359
    assert g.row_for_y(-89.5) == 359
    assert g.row_for_y(-90) == 359
    assert g.col_for_x(-180) == 0
    assert g.col_for_x(-179.000001) == 0
    assert g.col_for_x(-179) == 1
    assert g.col_for_x(179) == 359
    assert g.col_for_x(180) == 359


def test_shrink_to_fit_golden():
    # test_grid.cpp:94-105
    g = Grid(-180, -90, 180, 90, 1.0, 0.5)
    s = g.crop_to_box(Box(-44.3, -21.4, 18.3, 88.2))
    assert s.xmin == -45 and s.xmax == 19
    assert s.ymin == -21.5 and s.ymax == 88.5
    assert s.dx == g.dx and s.dy == g.dy


def test_repeated_shrink_no_effect():
    # test_grid.cpp:107-116
    g = Grid(-180.5, -90, 180, 90, 0.1, 0.1)
    reduced = Box(
        8.532812500000006, 1.6762207031249972,
        16.183398437500017, 13.078515624999994,
    )
    s2 = g.crop_to_box(reduced)
    s3 = s2.crop_to_box(reduced)
    assert s2.nrow == s3.nrow and s2.ncol == s3.ncol


@pytest.mark.parametrize(
    "grid,box",
    [
        # test_grid.cpp:118-129
        (
            Grid(-180.5, -90, 180, 90, 0.5, 0.5),
            Box(-1.0000000000000142, 8.141666666665664,
                0.08749999999993818, 9.904166666665645),
        ),
        # test_grid.cpp:131-142
        (
            Grid(-180.5, -90.5, 180.5, 90.5, 0.25, 0.25),
            Box(129.75833333333242, -1.2541666666666238,
                129.7624999999993, -1.2499999999999964),
        ),
    ],
)
def test_shrink_robustness(grid, box):
    s = grid.crop_to_box(box)
    # snapped-out extent still contains the box (within the snap tolerance
    # the reference also applies, grid.h:138-217)
    tol = 1e-6 * max(grid.dx, grid.dy)
    assert box.xmin >= s.xmin - tol and box.xmax <= s.xmax + tol
    assert box.ymin >= s.ymin - tol and box.ymax <= s.ymax + tol


def test_cropping_goldens():
    # test_grid.cpp:144-165
    g = Grid(0, 0, 10, 10, 0.5, 0.5)

    assert g.crop_to_box(Box(-100, -100, 100, 100)) == g
    assert g.crop_to_box(g.extent) == g
    assert g.crop_to_box(Box(1.8, 2.2, 6.4, 7.5)) == Grid(1.5, 2.0, 6.5, 7.5, 0.5, 0.5)
    # does not expand beyond the grid's own extent
    assert g.crop_to_box(Box(1.8, -2, 11, 7.5)) == Grid(1.5, 0, 10, 7.5, 0.5, 0.5)
    # box edges exactly on cell boundaries
    assert g.crop_to_box(Box(2, 2, 8, 8)) == Grid(2, 2, 8, 8, 0.5, 0.5)
    # fully outside -> empty
    assert g.crop_to_box(Box(200, 200, 300, 300)).empty()
    assert g.crop_to_box(Box(100, 100, 200, 100)).empty()


def test_cropping_robustness():
    # test_grid.cpp:167-184
    third = 0.0083333333333333332
    g = Grid(-180, -90, 180, 90, third, third)
    c = g.crop_to_box(Box(178.60767788357205, 70.782677883572063,
                          180, 71.542309400770421))
    assert g.extent.contains(c.extent)

    g2 = Grid(-180, -90, 180, 90, 0.5, 0.5)
    c2 = g2.crop_to_box(Box(179.749999999999972, -18.5833333333333321,
                            179.999999999999972, -18.5))
    assert g2.extent.contains(c2.extent)


def test_compatibility_battery():
    # test_grid.cpp:186-204
    tol = 1e-6
    half = GLOBAL
    one = Grid(-180, -90, 180, 90, 1, 1)
    quarter_partial = Grid(-180, -60, 90, 83, 0.25, 0.25)
    nldas = Grid(-125.0, 0.25, -67, 53, 0.125, 0.125)
    tenth = Grid(-180, -90, 180, 90, 0.1, 0.1)
    half_offset = Grid(-180.25, -90, -100.25, 50, 0.5, 0.5)

    assert half.compatible_with(one, tol)
    assert quarter_partial.compatible_with(one, tol)
    assert one.compatible_with(nldas, tol)
    assert half.compatible_with(tenth, tol)

    assert not quarter_partial.compatible_with(tenth, tol)
    assert not tenth.compatible_with(nldas, tol)
    assert not half.compatible_with(half_offset, tol)


def test_compatibility_with_tolerance():
    # test_grid.cpp:206-227
    third = 0.0083333333333333332
    a = Grid(60.525000000000006, 29.308333333333334,
             75.166666666666671, 38.491666666666667, third, third)
    b = Grid(60.5, 29, 75.5, 38.5, 0.5, 0.5)
    assert a.compatible_with(b, 1e-6)
    assert b.compatible_with(a, 1e-6)

    # the vignette pre-crop case: compatible only at the reduced tolerance
    a2 = Grid(-25.8583333333334, 37.6999999999999,
              -25.1333333333334, 37.9083333333333, 1.0 / 120, 1.0 / 120)
    b2 = Grid(-25.8550000000072, 37.7029166667142,
              -25.1345833334558, 37.9095833333478, 1.0 / 4800, 1.0 / 4800)
    assert a2.compatible_with(b2, 1e-3)
    assert b2.compatible_with(a2, 1e-3)


def test_compatibility_empty():
    # test_grid.cpp:229-237
    assert GLOBAL.compatible_with(Grid.make_empty(), 0.0)
    assert Grid.make_empty().compatible_with(GLOBAL, 0.0)
    assert Grid.make_empty().compatible_with(Grid.make_empty(), 0.0)


def test_common_and_overlapping_grid():
    # test_grid.cpp:239-253
    nldas = Grid(-125.0, 0.25, -67, 53, 0.125, 0.125)
    assert nldas.common_grid(GLOBAL) == Grid(-180, -90, 180, 90, 0.125, 0.125)
    assert nldas.overlapping_grid(GLOBAL) == nldas

    assert GLOBAL.common_grid(Grid.make_empty()) == GLOBAL
    assert GLOBAL.overlapping_grid(Grid.make_empty()).empty()


def test_cell_centers():
    # test_grid.cpp:255-264
    g = Grid(-180, -90, 180, 90, 0.5, 0.25)
    assert g.x_for_col(0) == -179.75
    assert g.y_for_row(0) == 89.875


def test_offsets():
    # test_grid.cpp:266-276 (direction-signed here: the subgrid computes its
    # own offset inside its parent)
    g1 = Grid(-180, -90, 180, 90, 0.5, 0.25)
    g2 = Grid(-170, -90, 180, 88.5, 0.5, 0.25)
    assert g2.row_offset(g1) == 6
    assert g2.col_offset(g1) == 20


def test_subdivision():
    # test_grid.cpp:299-323
    g = Grid(-180, -89.75, 180, 90, 0.25, 0.25)
    assert g.ncol == 1440 and g.nrow == 719

    grids = list(g.subdivide(1000))
    assert len(grids) == 2 * g.nrow
    assert grids[0].ncell == 1000
    assert grids[1].ncell == 440
    assert sum(s.ncell for s in grids) == g.ncell

    grids = list(g.subdivide(3000))
    assert len(grids) == math.ceil(0.5 * g.nrow)
    assert grids[0].ncell == 2880
    assert grids[1].ncell == 2880
    assert grids[-1].ncell == 1440  # leftover single row
    assert sum(s.ncell for s in grids) == g.ncell


def test_empty_subdivision():
    # test_grid.cpp:325-329 — no error
    assert list(Grid.make_empty().subdivide(100)) == []


def test_area_rasters():
    # test_raster_area.cpp:11-36 — cartesian cell area is dx*dy; spherical
    # cell area at (50N..51N, 1-degree) within 0.2% of the PostGIS geodesic
    # value 7892061583.206543 m^2
    from exactextractr_ray.pipelines.zonal import cell_area_matrix

    dx, dy = 1.0 / 3, 1.0 / 4
    g = Grid(0, 0, 10, 10, dx, dy)
    m = cell_area_matrix(g, 0, g.nrow, g.ncol, "cartesian")
    assert m[4, 3] == pytest.approx(dx * dy)

    g2 = Grid(0, 45, 10, 55, 1.0, 1.0)
    m2 = cell_area_matrix(g2, 0, g2.nrow, g2.ncol, "spherical")
    postgis_area = 7892061583.206543
    assert abs(m2[4, 3] - postgis_area) / postgis_area < 0.002
