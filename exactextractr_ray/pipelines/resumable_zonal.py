"""Resumable zonal statistics: band-partitioned partial-stats checkpoints
plus a merge-on-read finalize.

The north star's resume story for the AGGREGATION pipeline (BASELINE.json:
"recombined with a groupby-aggregate shuffle keyed on zone_id, with
per-partition lineage records enabling checkpoint/resume mid-run"):
each tile-row band's ~250-byte partial-stats rows (pipelines/zonal.py
ZonalPartialStats output) are written as one lineage-tracked parquet
partition; a killed run redoes only bands without a committed manifest
record; the finalize step reads ALL committed partials back and runs the
ordinary zone_id groupby merge. Because merge_partial_group sorts partial
rows by (tile_id, piece) before merging, the result is bit-identical to a
direct single-run exact_extract at any band count and any crash/resume
history.

Checkpoint volume is partial rows — O(zones x tiles-touched), never cells —
so at 100 TB the checkpoint is a rounding error next to the tile stream it
makes re-readable-once.
"""

from __future__ import annotations

import hashlib
import json

import pyarrow as pa

from ..sources.raster import RasterDataset
from ..state.lineage import read_resumable, resumable_write
from .zonal import exact_extract


def _zones_fingerprint(zones: pa.Table) -> str:
    h = hashlib.md5()
    for buf in zones.column("geom_wkb").to_pylist():
        h.update(buf)
    return h.hexdigest()


def resumable_zonal_stats(
    raster: RasterDataset,
    zones: pa.Table,
    stats: list[str],
    out_dir: str,
    bands: int = 8,
    **extract_kwargs,
) -> tuple[pa.Table, dict]:
    """Checkpointed exact_extract: returns (per-zone stats table, status)
    where status is {"written": [...], "skipped": [...]} from the
    partial-writing phase. Call again after a crash to resume: finished
    bands are skipped (fingerprint-checked), the finalize always runs."""
    tiles_y = raster.tiles_y
    zfp = _zones_fingerprint(zones)
    gdesc = json.dumps(raster.grid.to_dict(), sort_keys=True)

    band_rows = max(1, (tiles_y + bands - 1) // bands)
    partitions = {}
    for b in range(bands):
        ty0, ty1 = b * band_rows, min((b + 1) * band_rows, tiles_y)
        if ty0 >= tiles_y:
            break
        partitions[f"band{b:03d}"] = (ty0, ty1)

    def factory(key, spec):
        ty0, ty1 = spec
        row_lo = ty0 * raster.tile_h
        row_hi = ty1 * raster.tile_h
        band_ds = raster.ds.filter(
            expr=f"row0 >= {row_lo} and row0 < {row_hi}"
        )
        band_raster = RasterDataset(
            ds=band_ds,
            grid=raster.grid,
            tile_h=raster.tile_h,
            tile_w=raster.tile_w,
            layers=raster.layers,
        )
        return exact_extract(
            band_raster, zones, stats, return_partials=True, **extract_kwargs
        )

    def fingerprint(key, spec):
        return hashlib.md5(
            f"{gdesc}|{spec}|{zfp}|{stats}|{sorted(extract_kwargs.items())}".encode()
        ).hexdigest()

    status = resumable_write(
        out_dir, "zonal_partials", partitions, factory, fingerprint
    )
    partials = read_resumable(out_dir)
    result = exact_extract(
        raster, zones, stats, partials_source=partials, **extract_kwargs
    )
    return result, status
