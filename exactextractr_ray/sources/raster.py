"""Tiled-raster Dataset source.

The Ray-Data-native analog of the reference's RasterSource
(/root/reference/src/exactextract/src/raster_source.h:22-41): a logical
raster = a fixed global Grid + a Dataset of tiles, one row per (layer, tile):

    layer: string, tile_id: int64, ty/tx: int32, row0/col0: int32,
    th/tw: int32, values: list<float64>  (row-major, NaN = NODATA)

Tiles stream through the pipeline as Arrow blocks; nothing materializes the
whole raster. ``read_raster_parquet`` / ``write_raster_parquet`` persist the
tile table plus a JSON grid sidecar; ``synthetic_raster_dataset`` builds the
deterministic test raster WITHOUT materializing values on the driver — each
Ray task generates its own tiles from the integer rules in synth.py, so the
source scales to arbitrarily large grids (the 100 TB design point: reading
real tiles and generating synthetic ones have identical downstream shape).
"""

from __future__ import annotations

import json
import posixpath
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

import ray.data

from ..grid import Grid
from .. import synth

def tile_schema(value_type: pa.DataType = pa.float64()) -> pa.Schema:
    return pa.schema(
        [
            ("layer", pa.string()),
            ("tile_id", pa.int64()),
            ("ty", pa.int32()),
            ("tx", pa.int32()),
            ("row0", pa.int32()),
            ("col0", pa.int32()),
            ("th", pa.int32()),
            ("tw", pa.int32()),
            ("values", pa.list_(value_type)),
        ]
    )


TILE_SCHEMA = tile_schema()


@dataclass
class RasterDataset:
    """A logical tiled raster: grid metadata + a Ray Dataset of tiles."""

    ds: "ray.data.Dataset"
    grid: Grid
    tile_h: int
    tile_w: int
    layers: list[str] = field(default_factory=lambda: ["value"])

    @property
    def tiles_x(self) -> int:
        return (self.grid.ncol + self.tile_w - 1) // self.tile_w

    @property
    def tiles_y(self) -> int:
        return (self.grid.nrow + self.tile_h - 1) // self.tile_h

    @property
    def num_tiles(self) -> int:
        return self.tiles_x * self.tiles_y


def tile_batch(
    grid: Grid,
    tile_h: int,
    tile_w: int,
    tile_ids: np.ndarray,
    layer_fns: dict,
    dtype=np.float64,
) -> pa.Table:
    """Build an Arrow tile batch for the given tile ids.

    layer_fns: layer name -> fn(global_rows, global_cols) -> values array.
    dtype: stored cell dtype. float32 halves object-store traffic and is
    value-exact for integer-valued rasters < 2^24 (all consumers cast to
    float64 at the compute edge).
    """
    tiles_x = (grid.ncol + tile_w - 1) // tile_w
    out = {k: [] for k in ("layer", "tile_id", "ty", "tx", "row0", "col0", "th", "tw")}
    values_arrays: list[np.ndarray] = []
    offsets = [0]
    for tid in np.asarray(tile_ids, dtype=np.int64):
        ty, tx = int(tid) // tiles_x, int(tid) % tiles_x
        row0, col0 = ty * tile_h, tx * tile_w
        th = min(tile_h, grid.nrow - row0)
        tw = min(tile_w, grid.ncol - col0)
        # broadcast views (no materialized meshgrid): layer fns exploit the
        # separable row/col structure for cheap modular generation
        rr = np.broadcast_to(np.arange(row0, row0 + th)[:, None], (th, tw))
        cc = np.broadcast_to(np.arange(col0, col0 + tw)[None, :], (th, tw))
        for layer, fn in layer_fns.items():
            vals = np.asarray(fn(rr, cc), dtype=dtype).ravel()
            out["layer"].append(layer)
            out["tile_id"].append(int(tid))
            out["ty"].append(ty)
            out["tx"].append(tx)
            out["row0"].append(row0)
            out["col0"].append(col0)
            out["th"].append(th)
            out["tw"].append(tw)
            values_arrays.append(vals)
            offsets.append(offsets[-1] + len(vals))
    flat = (
        np.concatenate(values_arrays)
        if values_arrays
        else np.empty(0, dtype=dtype)
    )
    pa_type = pa.from_numpy_dtype(np.dtype(dtype))
    values = pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int32()), pa.array(flat, type=pa_type)
    )
    arrays = [
        pa.array(out["layer"], type=pa.string()),
        pa.array(out["tile_id"], type=pa.int64()),
        pa.array(out["ty"], type=pa.int32()),
        pa.array(out["tx"], type=pa.int32()),
        pa.array(out["row0"], type=pa.int32()),
        pa.array(out["col0"], type=pa.int32()),
        pa.array(out["th"], type=pa.int32()),
        pa.array(out["tw"], type=pa.int32()),
        values,
    ]
    return pa.Table.from_arrays(arrays, schema=tile_schema(pa_type))


def _synth_layer_fns(dtype):
    # generate in the stored dtype directly: skips a float64 intermediate
    # (values are small integers — exact in float32/int16; integer storage
    # uses the synth.INT_NODATA sentinel instead of NaN)
    return {
        "value": lambda rr, cc: synth.synth_values(rr, cc, dtype=dtype),
        "weight": lambda rr, cc: synth.synth_weights(rr, cc, dtype=dtype),
    }


def synthetic_raster_dataset(
    n: int = 64,
    tile: int = 16,
    layers: tuple[str, ...] = ("value",),
    parallelism: int | None = None,
    dtype=np.float32,
) -> RasterDataset:
    """Deterministic n x n raster as a streaming tile Dataset.

    Tiles are GENERATED inside Ray tasks from integer rules (synth.py), not
    shipped from the driver — the driver only enumerates tile ids. This is the
    scale path: a 10^6-tile raster costs the driver 8 MB of ids, and value
    blocks appear directly in the object store of the worker that computes
    them.
    """
    grid = synth.synth_grid(n)
    tiles_x = (n + tile - 1) // tile
    tiles_y = (n + tile - 1) // tile
    num_tiles = tiles_x * tiles_y
    if parallelism is None:
        # enough blocks for load balance (spatially-adjacent tiles do very
        # different amounts of zonal work; the id shuffle below spreads the
        # heavy ones), but proportional to cluster size so task-launch
        # overhead doesn't dominate on small clusters
        try:
            ncpu = int(ray.cluster_resources().get("CPU", 8))
        except Exception:
            ncpu = 8
        parallelism = max(1, min(num_tiles, 16 * ncpu))
    ids = ray.data.range(num_tiles, override_num_blocks=parallelism)
    all_fns = _synth_layer_fns(dtype)
    layer_fns = {k: all_fns[k] for k in layers}

    def make_tiles(batch: pa.Table) -> pa.Table:
        tile_ids = batch.column("id").to_numpy()
        # deterministic decorrelating permutation of tile ids (odd multiplier
        # mod num_tiles is a bijection when gcd(mult, num_tiles) == 1)
        mult = 2654435761
        while np.gcd(mult, num_tiles) != 1:
            mult += 2
        tile_ids = (tile_ids * mult) % num_tiles
        return tile_batch(grid, tile, tile, tile_ids, layer_fns, dtype=dtype)

    ds = ids.map_batches(make_tiles, batch_format="pyarrow")
    return RasterDataset(ds=ds, grid=grid, tile_h=tile, tile_w=tile, layers=list(layers))


def raster_from_array(
    arr: np.ndarray,
    grid: Grid,
    tile: int = 64,
    layer: str = "value",
    extra_layers: dict | None = None,
) -> RasterDataset:
    """In-memory array -> tile Dataset (test/small-data path)."""
    layer_fns = {layer: lambda rr, cc: arr[rr, cc]}
    for name, a in (extra_layers or {}).items():
        layer_fns[name] = (lambda a_: lambda rr, cc: a_[rr, cc])(a)
    tiles_x = (grid.ncol + tile - 1) // tile
    tiles_y = (grid.nrow + tile - 1) // tile
    tbl = tile_batch(
        grid, tile, tile, np.arange(tiles_x * tiles_y), layer_fns
    )
    ds = ray.data.from_arrow(tbl)
    return RasterDataset(
        ds=ds, grid=grid, tile_h=tile, tile_w=tile, layers=list(layer_fns)
    )


def write_raster_parquet(rd: RasterDataset, path: str) -> None:
    """Persist tiles + grid sidecar. Tiles are partitioned by Ray into
    multiple files -> resumable, parallel re-read."""
    rd.ds.write_parquet(path)
    meta = {
        "grid": rd.grid.to_dict(),
        "tile_h": rd.tile_h,
        "tile_w": rd.tile_w,
        "layers": rd.layers,
    }
    with open(posixpath.join(path, "_raster_meta.json"), "w") as f:
        json.dump(meta, f)


def read_raster_parquet(path: str) -> RasterDataset:
    with open(posixpath.join(path, "_raster_meta.json")) as f:
        meta = json.load(f)
    ds = ray.data.read_parquet(path, file_extensions=["parquet"])
    return RasterDataset(
        ds=ds,
        grid=Grid.from_dict(meta["grid"]),
        tile_h=meta["tile_h"],
        tile_w=meta["tile_w"],
        layers=meta["layers"],
    )


def tile_values(row: dict) -> np.ndarray:
    """Tile row -> (th, tw) float64 matrix."""
    return np.asarray(row["values"], dtype=np.float64).reshape(
        int(row["th"]), int(row["tw"])
    )
