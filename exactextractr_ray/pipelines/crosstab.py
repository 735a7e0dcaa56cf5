"""Raster x raster cross-tabulation (R ``raster::crosstab`` /
``terra::crosstab`` parity) — the landcover-change-matrix op.

Counts cells per (class_a, class_b) combination across two co-registered
layers of a tiled raster Dataset. The Ray-Data shape is the canonical
partial-aggregate pattern: each tile reduces its (up to) tile_h*tile_w
cells to a handful of (combined_key, n) partial rows inside
``map_batches`` (np.unique over an int64 combined key — no Python loop
over cells), so the groupby shuffle moves O(distinct classes) rows per
tile, not cells. At 100 TB the exchange volume is bounded by
tiles x class-combinations regardless of raster size.

Cells where EITHER layer is NODATA (NaN) are excluded — R's crosstab
default (useNA=FALSE).

Reference context: the reference has no crosstab, but its users compose
exact_extract with terra::crosstab for change matrices; this closes that
workflow gap (SURVEY.md §2 breadth).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..sources.raster import RasterDataset

_KEY_SHIFT = 32  # combined key = class_a << 32 | class_b


def raster_crosstab(
    raster: RasterDataset,
    a_layer: str = "value",
    b_layer: str = "weight",
    a_bin: float = 1.0,
    b_bin: float = 1.0,
):
    """Cross-tabulate two layers of ``raster``.

    ``a_bin`` / ``b_bin`` quantize each layer to ``floor(v / bin)`` classes
    (bin=1.0 keeps integer-valued layers as-is). Class codes must be
    non-negative and < 2^31 (true for any quantized raster; asserted per
    batch). Returns a Dataset of (class_a:int64, class_b:int64,
    n_cells:int64).
    """

    def partial(batch: pa.Table) -> pa.Table:
        layers = batch.column("layer").to_pylist()
        tids = batch.column("tile_id").to_numpy()
        vals = batch.column("values")
        rows_a = {int(t): i for i, (t, l) in enumerate(zip(tids, layers)) if l == a_layer}
        keys_out = []
        counts_out = []
        for i, (t, l) in enumerate(zip(tids, layers)):
            if l != b_layer:
                continue
            ia = rows_a.get(int(t))
            if ia is None:  # pragma: no cover - generator pairs layers per batch
                raise ValueError(f"tile {t}: layer {a_layer!r} not in batch")
            a = np.asarray(vals[ia].values, dtype=np.float64)
            b = np.asarray(vals[i].values, dtype=np.float64)
            ok = ~(np.isnan(a) | np.isnan(b))
            if not ok.any():
                continue
            ca = np.floor(a[ok] / a_bin).astype(np.int64)
            cb = np.floor(b[ok] / b_bin).astype(np.int64)
            assert ca.min() >= 0 and cb.min() >= 0 and ca.max() < 2**31 and cb.max() < 2**31
            key = (ca << _KEY_SHIFT) | cb
            uk, cnt = np.unique(key, return_counts=True)
            keys_out.append(uk)
            counts_out.append(cnt.astype(np.int64))
        if keys_out:
            k = np.concatenate(keys_out)
            n = np.concatenate(counts_out)
        else:
            k = np.empty(0, np.int64)
            n = np.empty(0, np.int64)
        return pa.table({"key": pa.array(k, pa.int64()), "n": pa.array(n, pa.int64())})

    agg = (
        raster.ds.map_batches(partial, batch_format="pyarrow")
        .groupby("key")
        .sum("n")
    )

    def finalize(b: pa.Table) -> pa.Table:
        key = b.column("key").to_numpy()
        n = b.column(1).to_numpy()
        return pa.table(
            {
                "class_a": pa.array(key >> _KEY_SHIFT, pa.int64()),
                "class_b": pa.array(key & ((1 << _KEY_SHIFT) - 1), pa.int64()),
                "n_cells": pa.array(n.astype(np.int64), pa.int64()),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")
