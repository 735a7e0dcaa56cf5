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


class GeoTiffFeatureSequentialStats(FeatureSequentialStats):
    """Feature-sequential stats straight off a GeoTIFF: each worker holds a
    lazy GeoTiffFile and answers a zone's window request with byte-range
    reads of only the intersecting chunks — byte-for-byte the reference's
    GDAL access shape (feature_sequential_processor.cpp:24-91 +
    gdal_raster_wrapper window reads), no parquet conversion step."""

    def __init__(self, tif_path: str, band: int, tile: int,
                 stats: list[str], quantiles: list[float]):
        from ..sources.geotiff import GeoTiffFile

        self.gf = GeoTiffFile(tif_path, band=band)
        self.grid = self.gf.grid
        self.tile_h = self.tile_w = tile
        self.value_layer = "value"
        self.weight_layer = None
        self.stats = stats
        self.quantiles = quantiles
        self.store_values = bool(
            {"mode", "majority", "minority", "variety", "median", "quantile",
             "frac", "weighted_frac"} & set(stats)
        )
        self.tiles_x = (self.grid.ncol + tile - 1) // tile

    def _read_window(self, tids: list[int], layer: str) -> pa.Table:
        """Same tile-row contract as the parquet path, backed by lazy
        window reads over the engine's virtual tiling of the file."""
        g = self.grid
        cols = {k: [] for k in ("tile_id", "row0", "col0", "th", "tw")}
        values = []
        for tid in tids:
            ty, tx = tid // self.tiles_x, tid % self.tiles_x
            row0, col0 = ty * self.tile_h, tx * self.tile_w
            th = min(self.tile_h, g.nrow - row0)
            tw = min(self.tile_w, g.ncol - col0)
            cols["tile_id"].append(tid)
            cols["row0"].append(row0)
            cols["col0"].append(col0)
            cols["th"].append(th)
            cols["tw"].append(tw)
            values.append(self.gf.read_window(row0, col0, th, tw).ravel())
        flat = np.concatenate(values) if values else np.empty(0)
        offsets = np.zeros(len(values) + 1, dtype=np.int32)
        if values:
            offsets[1:] = np.cumsum([len(v) for v in values])
        return pa.table(
            {
                "tile_id": pa.array(cols["tile_id"], pa.int64()),
                "row0": pa.array(cols["row0"], pa.int32()),
                "col0": pa.array(cols["col0"], pa.int32()),
                "th": pa.array(cols["th"], pa.int32()),
                "tw": pa.array(cols["tw"], pa.int32()),
                "values": pa.ListArray.from_arrays(
                    pa.array(offsets, pa.int32()),
                    pa.array(flat, pa.float64()),
                ),
            }
        )


def exact_extract_feature_seq_geotiff(
    tif_path: str,
    zones: pa.Table,
    stats: list[str],
    band: int = 1,
    tile: int = 256,
    quantiles: list[float] | None = None,
):
    """Feature-sequential exact_extract over a GeoTIFF file (per-zone
    byte-range window reads; no intermediate format). Same stat contract
    as the parquet feature-sequential plan."""
    import ray.data

    from ..util import cached_stage

    if {"frac", "weighted_frac"} & set(stats):
        raise ValueError(
            "frac/weighted_frac need the global value union across zones — "
            "use the raster-sequential plan (exact_extract)"
        )
    zds = ray.data.from_arrow(zones)
    out = zds.map_batches(
        cached_stage(
            GeoTiffFeatureSequentialStats,
            tif_path,
            band,
            tile,
            list(stats),
            list(quantiles or [0.5]),
        ),
        batch_format="pyarrow",
        batch_size=8,
    )
    df = out.to_pandas().sort_values("zone_seq").reset_index(drop=True)
    return pa.Table.from_pandas(
        df.drop(columns=["zone_seq"]), preserve_index=False
    )
