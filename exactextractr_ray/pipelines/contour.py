"""Contour (isoline) extraction via marching squares — the gdal_contour
/ terra::as.contour surface.

Marching squares runs on the DUAL grid: each 2x2 block of cell-center
values (anchored at its top-left cell) classifies its four corners
against the threshold and emits 0-2 line segments with linearly
interpolated crossings. Blocks need the right/bottom neighbor row and
column, so the op rides the same 1-deep tile HALO EXCHANGE as the focal
family (``pipelines/focal.py:_run_focal``): each tile computes exactly
the blocks anchored in its own body (halo provides the neighbor cells),
so every block is emitted exactly once at any tiling.

Conventions (each mirrored literally by the DuckDB oracle):

* a corner is "inside" iff value > threshold; blocks with any NaN corner
  are skipped (the GDAL NODATA rule);
* case bits: TL=1, TR=2, BR=4, BL=8;
* saddles (cases 5 / 10) resolve by the center average
  (vTL+vTR+vBL+vBR vs 4*threshold, exact integer comparison for
  integer-valued rasters);
* crossing interpolation ``t = (T - v0) / (v1 - v0)`` is one exact
  subtraction pair and ONE rounded division; each output coordinate adds
  one more rounded op — bit-deterministic, so the oracle matches
  bit-for-bit when the raster is integer-valued and T is half-integral.

Output: one row per segment (block:int64 anchor cell id, seg:int64,
case_idx:int64, xa, ya, xb, yb float64 world coords).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..sources.raster import RasterDataset
from .focal import _cell_ids, _run_focal

# case -> ((edge_a, edge_b), ...); saddle cases keyed by (case, center_in)
_SEGS = {
    1: (("L", "T"),),
    2: (("T", "R"),),
    3: (("L", "R"),),
    4: (("R", "B"),),
    6: (("T", "B"),),
    7: (("L", "B"),),
    8: (("B", "L"),),
    9: (("T", "B"),),
    11: (("R", "B"),),
    12: (("R", "L"),),
    13: (("T", "R"),),
    14: (("T", "L"),),
}
_SADDLE = {
    (5, True): (("T", "L"), ("B", "R")),
    (5, False): (("T", "R"), ("B", "L")),
    (10, True): (("T", "R"), ("B", "L")),
    (10, False): (("T", "L"), ("B", "R")),
}


def contour_segments(
    raster: RasterDataset, threshold: float, broadcast_cap: int | None = None
):
    n_rows, n_cols = raster.grid.nrow, raster.grid.ncol
    T = float(threshold)

    def window(canvas, row0, col0, th, tw) -> pa.Table:
        # corners of blocks anchored at each body cell (right/bottom from halo)
        tl = canvas[1 : 1 + th, 1 : 1 + tw]
        tr = canvas[1 : 1 + th, 2 : 2 + tw]
        bl = canvas[2 : 2 + th, 1 : 1 + tw]
        br = canvas[2 : 2 + th, 2 : 2 + tw]
        rr = np.arange(row0, row0 + th)[:, None] * np.ones((1, tw), np.int64)
        cc = np.ones((th, 1), np.int64) * np.arange(col0, col0 + tw)[None, :]
        ok = (
            ~(np.isnan(tl) | np.isnan(tr) | np.isnan(bl) | np.isnan(br))
            & (rr < n_rows - 1)
            & (cc < n_cols - 1)
        )
        case = (
            (tl > T).astype(np.int64)
            + 2 * (tr > T).astype(np.int64)
            + 4 * (br > T).astype(np.int64)
            + 8 * (bl > T).astype(np.int64)
        )
        center_in = (tl + tr + bl + br) > 4.0 * T
        cells = _cell_ids(row0, col0, th, tw, n_cols).reshape(th, tw)

        with np.errstate(invalid="ignore", divide="ignore"):
            # crossing coordinates per edge (only consumed where defined)
            xbase = cc.astype(np.float64) + 0.5
            ytop = (n_rows - rr).astype(np.float64) - 0.5
            x_top = xbase + (T - tl) / (tr - tl)
            y_top = ytop
            x_bot = xbase + (T - bl) / (br - bl)
            y_bot = ytop - 1.0
            x_left = xbase
            y_left = ytop - (T - tl) / (bl - tl)
            x_right = xbase + 1.0
            y_right = ytop - (T - tr) / (br - tr)

        ex = {"T": x_top, "B": x_bot, "L": x_left, "R": x_right}
        ey = {"T": y_top, "B": y_bot, "L": y_left, "R": y_right}

        out_block, out_seg, out_case = [], [], []
        out = {k: [] for k in ("xa", "ya", "xb", "yb")}

        def emit(mask, ci, segs):
            if not mask.any():
                return
            for si, (ea, eb) in enumerate(segs):
                out_block.append(cells[mask])
                out_seg.append(np.full(mask.sum(), si, np.int64))
                out_case.append(np.full(mask.sum(), ci, np.int64))
                out["xa"].append(ex[ea][mask])
                out["ya"].append(ey[ea][mask])
                out["xb"].append(ex[eb][mask])
                out["yb"].append(ey[eb][mask])

        for ci, segs in _SEGS.items():
            emit(ok & (case == ci), ci, segs)
        for (ci, cin), segs in _SADDLE.items():
            emit(ok & (case == ci) & (center_in == cin), ci, segs)

        def cat(parts, dt):
            return (
                np.concatenate(parts) if parts else np.empty(0, dt)
            )

        return pa.table(
            {
                "block": pa.array(cat(out_block, np.int64), pa.int64()),
                "seg": pa.array(cat(out_seg, np.int64), pa.int64()),
                "case_idx": pa.array(cat(out_case, np.int64), pa.int64()),
                "xa": pa.array(cat(out["xa"], np.float64), pa.float64()),
                "ya": pa.array(cat(out["ya"], np.float64), pa.float64()),
                "xb": pa.array(cat(out["xb"], np.float64), pa.float64()),
                "yb": pa.array(cat(out["yb"], np.float64), pa.float64()),
            }
        )

    return _run_focal(raster, window, broadcast_cap)
