"""The reference's 7 numbered robustness regressions
(/root/reference/src/exactextract/test/test_raster_cell_intersection.cpp:
511-614), run against this engine's coverage kernel using the same
real-world WKT inputs (read from the reference's test resources —
public Natural Earth data, not code)."""

import numpy as np
import pytest

from exactextractr_ray import wkbio
from exactextractr_ray.coverage import coverage_matrix
from exactextractr_ray.grid import Grid

import os

RES = "/root/reference/src/exactextract/test/resources"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(RES), reason="reference WKT resources not available"
)


def _load(name: str) -> list[dict]:
    with open(f"{RES}/{name}") as f:
        return wkbio.parse_wkt(f.read())


def _check_bounds(cov: np.ndarray, max_frac: float = 1.0):
    assert np.all(cov >= 0.0)
    assert np.all(cov <= max_frac + 1e-9)


def test_regression_1_antarctica():
    # polygon follows ymin; ymin < (ymax - ny*dy) rounding hazard
    g = Grid(-180, -90, 180, 90, 1.0 / 6, 1.0 / 6)
    parts = _load("antarctica.wkt")
    cov = coverage_matrix(g, parts)
    _check_bounds(cov, 1.0)
    # total covered area must approximate the polygon's shoelace area
    area = sum(sum(wkbio.ring_area_signed(r) for r in p["rings"]) for p in parts)
    cell_area = (1.0 / 6) ** 2
    assert cov.sum() * cell_area == pytest.approx(area, rel=1e-6)


def test_regression_2_russia():
    # polygon follows xmax; xmax < (xmin + nx*dx) rounding hazard
    g = Grid(-180, -90, 180, 90, 1.0 / 6, 1.0 / 6)
    parts = _load("russia.wkt")
    cov = coverage_matrix(g, parts)
    _check_bounds(cov, 1.0)
    area = sum(sum(wkbio.ring_area_signed(r) for r in p["rings"]) for p in parts)
    assert cov.sum() * (1.0 / 6) ** 2 == pytest.approx(area, rel=1e-6)


def test_regression_3_sliver():
    g = Grid(
        179.96666666664618,
        -16.541666666669137,
        179.99999999997954,
        -16.475000000002474,
        0.0083333333333328596,
        0.0083333333333328596,
    )
    parts = wkbio.parse_wkt(
        "POLYGON ((179.9715827094184135 -16.5409617106119526, "
        "180.0000000000000000 -16.5326999999999984, "
        "179.9872884114583655 -16.5342697143554425, "
        "179.9715827094184135 -16.5409617106119526))"
    )
    cov = coverage_matrix(g, parts)
    _check_bounds(cov)


def test_regression_4_alaska():
    g = Grid(
        -166.84166666666667,
        66.991666666666674,
        -152.625,
        71.358333333333334,
        0.0083333333333333332,
        0.0083333333333333332,
    )
    cov = coverage_matrix(g, _load("regression4.wkt"))
    _check_bounds(cov)


def test_regression_5_buffered_point():
    g = Grid(0, 0, 10, 10, 1, 1)
    cov = coverage_matrix(g, wkbio.parse_wkb(wkbio.circle_wkb(2, 2, 1, 30)))
    _check_bounds(cov)
    assert cov.sum() == pytest.approx(0.5 * 30 * np.sin(2 * np.pi / 30), rel=1e-9)


def test_regression_6_total_823():
    # grid-aligned polygon: total coverage exactly 823 cells
    g = Grid(145.925, -35.525, 147.375, -33.475, 0.05, 0.05)
    cov = coverage_matrix(g, _load("regression6.wkt"))
    _check_bounds(cov)
    assert cov.sum() == pytest.approx(823.0, abs=1e-6)


def test_regression_7_degenerate_triangle():
    # near-degenerate triangle with a repeated near-identical vertex; per-cell
    # fraction must not exceed polygon_area / cell_area
    g = Grid(487800, 5813800, 492800, 5818800, 100, 100)
    parts = wkbio.parse_wkt(
        "POLYGON ((492094.9283999996 5816959.8553, "
        "492374.9335527361 5816811.352641133, "
        "492374.9335527363 5816811.352641133, "
        "492094.9283999996 5816959.8553))"
    )
    area = abs(wkbio.ring_area_signed(parts[0]["rings"][0]))
    max_frac = area / (100 * 100)
    cov = coverage_matrix(g, parts)
    assert np.all(cov >= -1e-12)
    assert np.all(cov <= max_frac + 1e-12)
