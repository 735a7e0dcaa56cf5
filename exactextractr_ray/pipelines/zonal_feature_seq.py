"""Feature-sequential zonal plan: parallel over ZONES, raster windows read
on demand from a re-readable tile-parquet source.

The reference's FeatureSequentialProcessor
(/root/reference/src/exactextract/src/feature_sequential_processor.cpp:24-91)
iterates features, crops the grid to each feature's bbox, and reads only the
needed raster windows. That shape wins when zones ≪ tiles and the raster is
re-readable: no tile ever streams that no zone touches.

Ray-Data form: the ZONES are the Dataset (one row per zone); an actor-pool
stage holds the raster's tile manifest (tile_id -> parquet fragment row
group) built ONCE per actor from the parquet footers, and each zone reads
exactly its intersecting tiles with a pyarrow ``tile_id in (...)`` filter —
predicate-pushdown I/O, not a full scan. Stats per zone finish inside the
map task (no shuffle at all: a zone's whole state lives in one task, like
the reference), so the only movement is zone rows in and result rows out.

Partitioning assumption (documented per the build contract): each zone's
intersecting window must fit one worker's memory — the same
``max_cells_in_memory`` contract as the reference; oversized zones belong on
the raster-sequential plan (pipelines/zonal.py), which decomposes them.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.dataset as pads

import ray

from ..grid import Box, Grid
from ..sources.zones import ZoneSet, parse_zone_table
from ..stats import RasterStats
from .zonal import zone_coverage


class FeatureSequentialStats:
    """Actor stage: zone batches -> stat rows, reading raster windows lazily."""

    def __init__(
        self,
        parquet_path: str,
        grid_dict: dict,
        tile_h: int,
        tile_w: int,
        value_layer: str,
        weight_layer: str | None,
        stats: list[str],
        quantiles: list[float],
    ):
        self.grid = Grid.from_dict(grid_dict)
        self.tile_h = tile_h
        self.tile_w = tile_w
        self.value_layer = value_layer
        self.weight_layer = weight_layer
        self.stats = stats
        self.quantiles = quantiles
        self.store_values = bool(
            {"mode", "majority", "minority", "variety", "median", "quantile",
             "frac", "weighted_frac"} & set(stats)
        )
        # dataset handle built once per actor; fragments/footers cached by
        # pyarrow across read_table calls
        self._pads = pads.dataset(parquet_path, format="parquet")
        self.tiles_x = (self.grid.ncol + tile_w - 1) // tile_w

    def _tiles_for(self, box: Box) -> list[int]:
        g = self.grid
        c0 = max(int((box.xmin - g.xmin) / g.dx) // self.tile_w, 0)
        c1 = min(
            int(np.ceil((box.xmax - g.xmin) / g.dx - 1e-12)) // self.tile_w,
            self.tiles_x - 1,
        )
        r0 = max(int((g.ymax - box.ymax) / g.dy) // self.tile_h, 0)
        tiles_y = (g.nrow + self.tile_h - 1) // self.tile_h
        r1 = min(
            int(np.ceil((g.ymax - box.ymin) / g.dy - 1e-12)) // self.tile_h,
            tiles_y - 1,
        )
        if c1 < c0 or r1 < r0:
            return []
        return [
            r * self.tiles_x + c
            for r in range(r0, r1 + 1)
            for c in range(c0, c1 + 1)
        ]

    def _read_window(self, tids: list[int], layer: str):
        import pyarrow.compute as pc

        flt = pc.field("tile_id").isin(tids) & (pc.field("layer") == layer)
        t = self._pads.to_table(
            filter=flt,
            columns=["tile_id", "row0", "col0", "th", "tw", "values"],
        )
        return t

    def __call__(self, batch: pa.Table) -> pa.Table:
        zones = parse_zone_table(batch)
        out_rows = []
        for zi in range(len(zones)):
            e = zones.envelopes[zi]
            zbox = Box(e[0], e[1], e[2], e[3])
            tids = self._tiles_for(zbox)
            st = RasterStats(store_values=self.store_values)
            if tids:
                vt = self._read_window(tids, self.value_layer)
                wt = (
                    self._read_window(tids, self.weight_layer)
                    if self.weight_layer
                    else None
                )
                wmap = {}
                if wt is not None:
                    for j in range(wt.num_rows):
                        wmap[int(wt.column("tile_id")[j].as_py())] = j
                # deterministic merge order: sorted tile_id (same contract as
                # the raster-sequential plan's sorted-tile merge)
                order = np.argsort(vt.column("tile_id").to_numpy(), kind="stable")
                for j in order.tolist():
                    row0 = int(vt.column("row0")[j].as_py())
                    col0 = int(vt.column("col0")[j].as_py())
                    th = int(vt.column("th")[j].as_py())
                    tw = int(vt.column("tw")[j].as_py())
                    sub = self.grid.subgrid(row0, col0, th, tw).crop_to_box(zbox)
                    if sub.empty():
                        continue
                    cov = zone_coverage(sub, zones.parts[zi])
                    if not np.any(cov):
                        continue
                    vals = np.asarray(
                        vt.column("values")[j].values, dtype=np.float64
                    ).reshape(th, tw)
                    r0 = sub.row_offset(self.grid.subgrid(row0, col0, th, tw))
                    c0 = sub.col_offset(self.grid.subgrid(row0, col0, th, tw))
                    vwin = vals[r0 : r0 + sub.nrow, c0 : c0 + sub.ncol]
                    ws = None
                    if wt is not None:
                        wj = wmap.get(int(vt.column("tile_id")[j].as_py()))
                        if wj is not None:
                            ws = np.asarray(
                                wt.column("values")[wj].values, dtype=np.float64
                            ).reshape(th, tw)[
                                r0 : r0 + sub.nrow, c0 : c0 + sub.ncol
                            ]
                    st.process(vwin, cov, ws)
            row = {"zone_id": int(zones.zone_ids[zi]),
                   "zone_seq": int(zones.zone_seq[zi])}
            for s in self.stats:
                if s == "quantile":
                    for q in self.quantiles:
                        row[f"q{q}"] = st.quantile(q)
                else:
                    row[s] = st.result(s)
            out_rows.append(row)
        return pa.Table.from_pylist(out_rows)


def exact_extract_feature_seq(
    parquet_path: str,
    zones: pa.Table,
    stats: list[str],
    value_layer: str = "value",
    weight_layer: str | None = None,
    quantiles: list[float] | None = None,
    concurrency=None,
):
    """Feature-sequential exact_extract over a tile-parquet raster.

    Returns one row per zone in input order, same stat definitions as the
    raster-sequential plan (results bit-identical — asserted in tests).
    """
    import json
    import posixpath

    import ray.data

    from ..util import cached_stage

    if {"frac", "weighted_frac"} & set(stats):
        raise ValueError(
            "frac/weighted_frac need the global value union across zones — "
            "use the raster-sequential plan (exact_extract)"
        )

    with open(posixpath.join(parquet_path, "_raster_meta.json")) as f:
        meta = json.load(f)
    zds = ray.data.from_arrow(zones)
    out = zds.map_batches(
        cached_stage(
            FeatureSequentialStats,
            parquet_path,
            meta["grid"],
            meta["tile_h"],
            meta["tile_w"],
            value_layer,
            weight_layer,
            list(stats),
            list(quantiles or [0.5]),
        ),
        batch_format="pyarrow",
        batch_size=8,  # a few zones per task: zones are the parallel unit
    )
    df = out.to_pandas().sort_values("zone_seq").reset_index(drop=True)
    return pa.Table.from_pandas(
        df.drop(columns=["zone_seq"]), preserve_index=False
    )
