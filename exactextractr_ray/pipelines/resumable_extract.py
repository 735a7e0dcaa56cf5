"""Resumable large-output pipeline: per-cell zonal extraction written as
partitioned parquet with per-partition lineage (north-rule requirement:
"resumable from checkpoint with per-partition lineage + metrics").

Partitions are tile-row bands of the raster grid — aligned with the tiling so
each partition's work is independent and its input fingerprint is just the
(grid, band, zones) description. A killed run resumes by recomputing only
the bands whose manifest record is missing or whose fingerprint changed.
"""

from __future__ import annotations

import hashlib
import json

import pyarrow as pa

from ..state.lineage import resumable_write
from ..sources.raster import RasterDataset
from .zonal import extract_cells


def _zones_fingerprint(zones: pa.Table) -> str:
    h = hashlib.md5()
    for buf in zones.column("geom_wkb").to_pylist():
        h.update(buf)
    return h.hexdigest()


def resumable_extract_cells(
    raster: RasterDataset,
    zones: pa.Table,
    out_dir: str,
    bands: int = 8,
    **extract_kwargs,
) -> dict:
    """Write the per-cell extraction table partitioned into ``bands``
    horizontal tile-row bands; returns {"written": [...], "skipped": [...]}."""
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
        return extract_cells(band_raster, zones, **extract_kwargs)

    def fingerprint(key, spec):
        return hashlib.md5(
            f"{gdesc}|{spec}|{zfp}|{sorted(extract_kwargs.items())}".encode()
        ).hexdigest()

    return resumable_write(out_dir, "extract_cells", partitions, factory, fingerprint)
