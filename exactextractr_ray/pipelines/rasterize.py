"""rasterize_polygons on Ray Data: burn the covering polygon's index into a
raster.

Reference semantics (/root/reference/src/rasterize.cpp:23-52,
/root/reference/R/rasterize.R:20-36): each cell takes the index of the
polygon covering the greatest area of it; ties keep the LOWEST index (strict
``>`` update in input order); cells whose TOTAL covered fraction is below
``min_coverage`` (or zero) are NA.

Ray shape: every cell belongs to exactly one tile, so the argmax is
tile-local — a pure ``map_batches`` over tile ids with the broadcast zone
set, NO shuffle at all (compare SURVEY.md §2.7, where a naive design would
groupby(cell)). Output is a tile Dataset of int32 zone indices (-1 = NA).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..coverage import coverage_matrix
from ..grid import Box, Grid
from ..sources.zones import ZoneSet, parse_zone_table


class RasterizeTile:
    def __init__(
        self, zones_ref, grid_dict: dict, min_coverage: float, tile_h: int, tile_w: int
    ):
        zones = ray.get(zones_ref) if not isinstance(zones_ref, ZoneSet) else zones_ref
        self.zones = zones
        self.grid = Grid.from_dict(grid_dict)
        self.min_coverage = min_coverage
        self.tile_h = tile_h
        self.tile_w = tile_w
        # zones must be processed in input order for the tie-break contract
        self.order = np.argsort(zones.zone_seq, kind="stable")

    def __call__(self, batch: pa.Table) -> pa.Table:
        tile_ids = batch.column("id").to_numpy()
        tiles_x = (self.grid.ncol + self.tile_w - 1) // self.tile_w
        out = {
            "tile_id": [],
            "ty": [],
            "tx": [],
            "row0": [],
            "col0": [],
            "th": [],
            "tw": [],
            "zone_index": [],
        }
        for tid in tile_ids:
            ty, tx = int(tid) // tiles_x, int(tid) % tiles_x
            row0, col0 = ty * self.tile_h, tx * self.tile_w
            th = min(self.tile_h, self.grid.nrow - row0)
            tw = min(self.tile_w, self.grid.ncol - col0)
            tile_grid = self.grid.subgrid(row0, col0, th, tw)
            max_cov = np.zeros((th, tw))
            tot_cov = np.zeros((th, tw))
            max_idx = np.full((th, tw), -1, dtype=np.int32)
            for zi in self.order:
                e = self.zones.envelopes[zi]
                if not tile_grid.extent.intersects(Box(e[0], e[1], e[2], e[3])):
                    continue
                sub = tile_grid.crop_to_box(Box(e[0], e[1], e[2], e[3]))
                if sub.empty():
                    continue
                cov_s = coverage_matrix(sub, self.zones.parts[zi])
                r0 = sub.row_offset(tile_grid)
                c0 = sub.col_offset(tile_grid)
                cov = np.zeros((th, tw))
                cov[r0 : r0 + sub.nrow, c0 : c0 + sub.ncol] = cov_s
                pos = cov > 0
                tot_cov[pos] += cov[pos]
                better = cov > max_cov  # strict: ties keep lowest index
                max_cov[better] = cov[better]
                max_idx[better] = self.zones.zone_seq[zi]
            max_idx[tot_cov < self.min_coverage] = -1
            if self.min_coverage <= 0:
                max_idx[tot_cov <= 0] = -1
            out["tile_id"].append(int(tid))
            out["ty"].append(ty)
            out["tx"].append(tx)
            out["row0"].append(row0)
            out["col0"].append(col0)
            out["th"].append(th)
            out["tw"].append(tw)
            out["zone_index"].append(max_idx.ravel().tolist())
        return pa.table(
            {
                "tile_id": pa.array(out["tile_id"], pa.int64()),
                "ty": pa.array(out["ty"], pa.int32()),
                "tx": pa.array(out["tx"], pa.int32()),
                "row0": pa.array(out["row0"], pa.int32()),
                "col0": pa.array(out["col0"], pa.int32()),
                "th": pa.array(out["th"], pa.int32()),
                "tw": pa.array(out["tw"], pa.int32()),
                "zone_index": pa.array(out["zone_index"], pa.list_(pa.int32())),
            }
        )


def rasterize_polygons(
    zones: pa.Table,
    grid: Grid,
    tile: int = 64,
    min_coverage: float = 0.0,
    concurrency=None,
):
    """Returns a Dataset of zone-index tiles (one row per tile; -1 = NA)."""
    zset = parse_zone_table(zones)
    zones_ref = ray.put(zset)
    tiles_x = (grid.ncol + tile - 1) // tile
    tiles_y = (grid.nrow + tile - 1) // tile
    from ..util import cached_stage

    ids = ray.data.range(tiles_x * tiles_y)
    return ids.map_batches(
        cached_stage(RasterizeTile, zones_ref, grid.to_dict(), min_coverage, tile, tile),
        batch_format="pyarrow",
    )
