"""Point-to-raster interpolation surfaces: IDW (gdal_grid
``invdist:power=2`` shape) and proximity/allocation (gdal_proximity /
``terra::distance`` shape) in one streaming pass.

Ray-Data shape: the seed-point table (small side) is broadcast ONCE via
``ray.put``; raster cells stream as a Dataset (generated inside tasks —
the driver ships only ids) and each batch computes min-distance,
nearest-seed allocation and the IDW estimate vectorized against all
seeds. Zero shuffle; at 100 TB the cost is cells x seeds multiply-adds
spread over the cluster, and a large seed set would swap in the
bucket-grid index of ``stages/pip_join.py`` unchanged.

Determinism contract: seeds and cell centers live on a quarter-cell
integer lattice, so squared distances are exact int64; IDW power-2
weights are the exact integers ``2^40 // d2`` and the numerator /
denominator sums are order-independent int64 adds, making the final
``num // den`` bit-exact at any parallelism (same fixed-point pattern as
pipelines/areal.py). A cell exactly on a seed takes that seed's value
(the standard IDW exact-hit rule); nearest-seed ties break to the
smallest seed id.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

W_SCALE = 1 << 40  # IDW weight = W_SCALE // d2 (power-2 kernel, fixed point)


def idw_proximity(n: int, seeds_q: np.ndarray, seed_vals: np.ndarray, parallelism: int | None = None):
    """Over the n x n unit grid (cell centers at quarter coords
    (4c+2, 4r+2)), compute per cell: squared distance to the nearest of
    ``seeds_q`` ((K, 2) int64 quarter coords), the nearest seed id
    (allocation), and the fixed-point power-2 IDW estimate of
    ``seed_vals`` (int64).

    Returns a Dataset of (cell:int64, min_d2:int64, nearest_id:int64,
    idw_fp:int64) where idw_fp ~= estimate << 0 in integer value units
    (num // den of the fixed-point weight sums).
    """
    seeds_q = np.asarray(seeds_q, dtype=np.int64)
    seed_vals = np.asarray(seed_vals, dtype=np.int64)
    ref = ray.put((seeds_q, seed_vals))

    def per_batch(batch: pa.Table) -> pa.Table:
        pts, vals = ray.get(ref)
        cell = batch.column("id").to_numpy().astype(np.int64)
        r = cell // n
        c = cell % n
        cx = (4 * c + 2)[:, None]
        cy = (4 * (n - 1 - r) + 2)[:, None]  # row 0 at top -> y = n-1-r cells
        dx = cx - pts[None, :, 0]
        dy = cy - pts[None, :, 1]
        d2 = dx * dx + dy * dy  # (B, K) int64, exact
        nearest = np.argmin(d2, axis=1)  # first minimum -> smallest seed id
        min_d2 = d2[np.arange(len(cell)), nearest]
        w = np.where(d2 > 0, W_SCALE // np.maximum(d2, 1), 0)
        num = (vals[None, :] * w).sum(axis=1)
        den = w.sum(axis=1)
        idw = num // np.maximum(den, 1)
        hit = min_d2 == 0
        idw = np.where(hit, vals[nearest], idw)
        return pa.table(
            {
                "cell": pa.array(cell, pa.int64()),
                "min_d2": pa.array(min_d2, pa.int64()),
                "nearest_id": pa.array(nearest.astype(np.int64), pa.int64()),
                "idw_fp": pa.array(idw, pa.int64()),
            }
        )

    ds = ray.data.range(n * n, override_num_blocks=parallelism or 16)
    return ds.map_batches(per_batch, batch_format="pyarrow")
