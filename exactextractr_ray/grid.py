"""Grid / Box algebra for the tiled-raster data model.

Semantics follow the reference's grid model (see
/root/reference/src/exactextract/src/grid.h:24-310 and box.h:25-147): a
rectilinear grid is an extent box plus a resolution; rows count from the TOP
(row 0 touches ymax), columns from the LEFT (col 0 touches xmin), matching the
R `raster` cell-numbering convention used by the reference
(/root/reference/src/raster_utils.cpp:110-118 — 1-based row-major cell ids).

This is a from-scratch Ray-Data-native implementation, not a port: grids are
plain metadata carried alongside Arrow tile tables; all heavy work happens in
vectorized numpy inside `map_batches` UDFs.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Iterator

import numpy as np

#: Tolerance used when snapping fractional offsets to whole cells, analogous to
#: the float fudging in the reference's grid algebra (grid.h:138-217).
DEFAULT_GRID_TOL = 1e-6


@dataclass(frozen=True)
class Box:
    xmin: float
    ymin: float
    xmax: float
    ymax: float

    def intersects(self, other: "Box") -> bool:
        return (
            self.xmin < other.xmax
            and self.xmax > other.xmin
            and self.ymin < other.ymax
            and self.ymax > other.ymin
        )

    def intersection(self, other: "Box") -> "Box":
        return Box(
            max(self.xmin, other.xmin),
            max(self.ymin, other.ymin),
            min(self.xmax, other.xmax),
            min(self.ymax, other.ymax),
        )

    def expand_to_include(self, other: "Box") -> "Box":
        return Box(
            min(self.xmin, other.xmin),
            min(self.ymin, other.ymin),
            max(self.xmax, other.xmax),
            max(self.ymax, other.ymax),
        )

    def contains(self, other: "Box") -> bool:
        return (
            self.xmin <= other.xmin
            and self.ymin <= other.ymin
            and self.xmax >= other.xmax
            and self.ymax >= other.ymax
        )

    @property
    def width(self) -> float:
        return self.xmax - self.xmin

    @property
    def height(self) -> float:
        return self.ymax - self.ymin

    @property
    def area(self) -> float:
        return max(0.0, self.width) * max(0.0, self.height)

    def empty(self) -> bool:
        return self.xmax <= self.xmin or self.ymax <= self.ymin


@dataclass(frozen=True)
class Grid:
    """A rectilinear grid: extent + resolution.

    ``nrow``/``ncol`` are derived by rounding, mirroring the reference
    (grid.h:40-46: ``round((ymax-ymin)/dy)``).
    """

    xmin: float
    ymin: float
    xmax: float
    ymax: float
    dx: float
    dy: float

    @property
    def nrow(self) -> int:
        return max(0, int(round((self.ymax - self.ymin) / self.dy)))

    @property
    def ncol(self) -> int:
        return max(0, int(round((self.xmax - self.xmin) / self.dx)))

    @property
    def ncell(self) -> int:
        return self.nrow * self.ncol

    @property
    def extent(self) -> Box:
        return Box(self.xmin, self.ymin, self.xmax, self.ymax)

    def empty(self) -> bool:
        return self.nrow == 0 or self.ncol == 0

    # --- coordinate helpers (vectorized-friendly scalars) ---

    def col_for_x(self, x: float) -> int:
        """Column containing x (clamped into range)."""
        c = int(math.floor((x - self.xmin) / self.dx))
        return min(max(c, 0), self.ncol - 1)

    def row_for_y(self, y: float) -> int:
        """Row containing y; row 0 at the top (ymax)."""
        r = int(math.floor((self.ymax - y) / self.dy))
        return min(max(r, 0), self.nrow - 1)

    def x_for_col(self, col) -> np.ndarray | float:
        """Cell-center x of column(s)."""
        return self.xmin + (np.asarray(col) + 0.5) * self.dx

    def y_for_row(self, row) -> np.ndarray | float:
        """Cell-center y of row(s); row 0 at the top."""
        return self.ymax - (np.asarray(row) + 0.5) * self.dy

    def cell_centers(self) -> tuple[np.ndarray, np.ndarray]:
        """(x, y) center arrays of shape (nrow, ncol)."""
        xs = self.xmin + (np.arange(self.ncol) + 0.5) * self.dx
        ys = self.ymax - (np.arange(self.nrow) + 0.5) * self.dy
        return np.broadcast_to(xs, (self.nrow, self.ncol)), np.broadcast_to(
            ys[:, None], (self.nrow, self.ncol)
        )

    # --- grid algebra ---

    def row_offset(self, parent: "Grid") -> int:
        """Rows between this grid's top and the parent grid's top."""
        return int(round((parent.ymax - self.ymax) / self.dy))

    def col_offset(self, parent: "Grid") -> int:
        return int(round((self.xmin - parent.xmin) / self.dx))

    def crop_to_box(self, box: Box) -> "Grid":
        """Shrink to the cells whose area intersects ``box`` (snapped outward
        to this grid's cell boundaries) — the analog of the reference's
        ``shrink_to_fit`` (grid.h:138-217)."""
        # degenerate (zero-width/height) boxes are valid: a horizontal or
        # vertical line's envelope still selects the row/column of cells it
        # lies in
        if box.xmax < box.xmin or box.ymax < box.ymin:
            return Grid(self.xmin, self.ymax, self.xmin, self.ymax, self.dx, self.dy)
        b = box.intersection(self.extent)
        if b.xmax < b.xmin or b.ymax < b.ymin:
            return Grid(self.xmin, self.ymax, self.xmin, self.ymax, self.dx, self.dy)
        # Snap outward, with a fudge so that a box edge falling exactly on a
        # cell boundary does not pull in an extra empty row/col.
        c0 = int(math.floor((b.xmin - self.xmin) / self.dx + DEFAULT_GRID_TOL))
        c1 = int(math.ceil((b.xmax - self.xmin) / self.dx - DEFAULT_GRID_TOL))
        r0 = int(math.floor((self.ymax - b.ymax) / self.dy + DEFAULT_GRID_TOL))
        r1 = int(math.ceil((self.ymax - b.ymin) / self.dy - DEFAULT_GRID_TOL))
        c0 = min(max(c0, 0), self.ncol)
        c1 = min(max(c1, c0), self.ncol)
        r0 = min(max(r0, 0), self.nrow)
        r1 = min(max(r1, r0), self.nrow)
        return self.subgrid(r0, c0, r1 - r0, c1 - c0)

    def subgrid(self, row0: int, col0: int, nrow: int, ncol: int) -> "Grid":
        """Subgrid at (row0, col0) of shape (nrow, ncol); row0 from the top."""
        return Grid(
            self.xmin + col0 * self.dx,
            self.ymax - (row0 + nrow) * self.dy,
            self.xmin + (col0 + ncol) * self.dx,
            self.ymax - row0 * self.dy,
            self.dx,
            self.dy,
        )

    @staticmethod
    def make_empty() -> "Grid":
        """Zero-size grid (the reference's Grid::make_empty)."""
        return Grid(0.0, 0.0, 0.0, 0.0, 1.0, 1.0)

    def compatible_with(self, other: "Grid", tol: float = 1e-3) -> bool:
        """True if resolutions are integer multiples and origins align —
        semantics of grid.h compatible_with (reference grid.h:130-217).
        An empty grid is compatible with everything (test_grid.cpp:229-237)."""
        if self.empty() or other.empty():
            return True
        for a, b in ((self.dx, other.dx), (self.dy, other.dy)):
            big, small = (a, b) if a >= b else (b, a)
            ratio = big / small
            if abs(ratio - round(ratio)) > tol:
                return False
        # Origins must differ by an integer number of the finer cell.
        fdx = min(self.dx, other.dx)
        fdy = min(self.dy, other.dy)
        for diff, res in (
            ((self.xmin - other.xmin) / fdx, fdx),
            ((self.ymin - other.ymin) / fdy, fdy),
        ):
            if abs(diff - round(diff)) > tol:
                return False
        return True

    def common_grid(self, other: "Grid") -> "Grid":
        """Union extent at the finer resolution (reference grid.h
        common_grid): requires compatible grids; an empty argument returns
        self unchanged (test_grid.cpp:239-253)."""
        if other.empty():
            return self
        if self.empty():
            return other
        return Grid(
            min(self.xmin, other.xmin),
            min(self.ymin, other.ymin),
            max(self.xmax, other.xmax),
            max(self.ymax, other.ymax),
            min(self.dx, other.dx),
            min(self.dy, other.dy),
        )

    def overlapping_grid(self, other: "Grid") -> "Grid":
        """Intersection extent at the finer resolution (reference grid.h
        overlapping_grid); empty if the extents are disjoint."""
        if self.empty() or other.empty():
            return Grid.make_empty()
        b = self.extent.intersection(other.extent)
        if b.xmax < b.xmin or b.ymax < b.ymin:
            return Grid.make_empty()
        return Grid(
            b.xmin, b.ymin, b.xmax, b.ymax,
            min(self.dx, other.dx), min(self.dy, other.dy),
        )

    def subdivide(self, max_cells: int) -> Iterator["Grid"]:
        """Split into row-block subgrids of at most ``max_cells`` cells each —
        the chunking mechanism of the reference (grid.cpp:74-99). If a single
        row exceeds max_cells the row is further split into column blocks."""
        if self.empty():
            return
        max_cells = max(1, int(max_cells))
        rows_per = max(1, max_cells // max(1, self.ncol))
        if self.ncol <= max_cells:
            for r0 in range(0, self.nrow, rows_per):
                nr = min(rows_per, self.nrow - r0)
                yield self.subgrid(r0, 0, nr, self.ncol)
        else:
            for r0 in range(self.nrow):
                for c0 in range(0, self.ncol, max_cells):
                    nc = min(max_cells, self.ncol - c0)
                    yield self.subgrid(r0, c0, 1, nc)

    def tiles(self, tile_h: int, tile_w: int) -> Iterator[tuple[int, int, int, "Grid"]]:
        """Iterate (tile_id, ty, tx, subgrid) over a regular tiling.

        tile_id = ty * tiles_x + tx; partial tiles at the right/bottom edges.
        """
        tiles_x = (self.ncol + tile_w - 1) // tile_w
        tiles_y = (self.nrow + tile_h - 1) // tile_h
        for ty in range(tiles_y):
            for tx in range(tiles_x):
                r0, c0 = ty * tile_h, tx * tile_w
                nr = min(tile_h, self.nrow - r0)
                nc = min(tile_w, self.ncol - c0)
                yield ty * tiles_x + tx, ty, tx, self.subgrid(r0, c0, nr, nc)

    def cell_numbers(self, rows, cols) -> np.ndarray:
        """1-based row-major cell ids (top-left = 1), matching the reference's
        get_cell_numbers (/root/reference/src/raster_utils.cpp:110-118)."""
        return np.asarray(rows, dtype=np.int64) * self.ncol + np.asarray(
            cols, dtype=np.int64
        ) + 1

    def to_dict(self) -> dict:
        return {
            "xmin": self.xmin,
            "ymin": self.ymin,
            "xmax": self.xmax,
            "ymax": self.ymax,
            "dx": self.dx,
            "dy": self.dy,
        }

    @staticmethod
    def from_dict(d: dict) -> "Grid":
        return Grid(d["xmin"], d["ymin"], d["xmax"], d["ymax"], d["dx"], d["dy"])
