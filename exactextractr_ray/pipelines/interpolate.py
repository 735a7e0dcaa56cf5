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


_FILL_DIRS = ((-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1),
              (1, -1), (1, 0), (1, 1))


def fillnodata(raster, max_dist: int = 8, broadcast_cap=None):
    """``gdal_fillnodata`` shape: NODATA (NaN) cells are filled by
    inverse-distance weighting of the FIRST valid cell found along each
    of the 8 compass rays within ``max_dist`` steps (GDAL's
    GDALFillNodata search semantics, with ray length measured in steps —
    the integer chamfer convention used throughout this toolbox).

    Exactness: for integer-valued rasters the weighted mean
    sum(v_i/d_i) / sum(1/d_i) is carried as the exact integer rational
    (num, den) over the common denominator D = prod(d_i)
    (d_i <= max_dist, <= 8 rays -> D <= max_dist^8 fits int64), so the
    result is order-independent and matches a DuckDB recomputation
    bit-for-bit; ``fill_val = num/den`` is one float division.

    Distributed shape: ONE k-deep halo exchange (the focal machinery,
    k = max_dist <= tile size) then a fully vectorized per-tile kernel
    (8 x max_dist shifted-window passes). Returns a Dataset of
    ``(cell, row, col, num, den, fill_val)`` for every fillable hole.
    """
    import pyarrow as pa

    from .focal import _cell_ids, _run_focal

    if max_dist < 1:
        raise ValueError("max_dist must be >= 1")
    if max_dist > min(raster.tile_h, raster.tile_w):
        raise ValueError("max_dist exceeds tile size (halo is one tile deep)")
    k = max_dist
    n_cols = raster.grid.ncol

    def window_fn(canvas, row0, col0, th, tw) -> pa.Table:
        valid = ~np.isnan(canvas)
        ivals = np.where(valid, np.round(canvas), 0).astype(np.int64)
        body_nan = ~valid[k:k + th, k:k + tw]
        nd = len(_FILL_DIRS)
        dists = np.zeros((nd, th, tw), np.int64)
        vals = np.zeros((nd, th, tw), np.int64)
        for di, (dy, dx) in enumerate(_FILL_DIRS):
            found = np.zeros((th, tw), bool)
            for s in range(1, k + 1):
                r0 = k + dy * s
                c0 = k + dx * s
                wv = valid[r0:r0 + th, c0:c0 + tw]
                new = wv & ~found
                if np.any(new):
                    dists[di][new] = s
                    vals[di][new] = ivals[r0:r0 + th, c0:c0 + tw][new]
                found |= wv
        has = dists > 0
        fill = body_nan & has.any(axis=0)
        if not np.any(fill):
            return pa.table(
                {
                    "cell": pa.array([], pa.int64()),
                    "row": pa.array([], pa.int64()),
                    "col": pa.array([], pa.int64()),
                    "num": pa.array([], pa.int64()),
                    "den": pa.array([], pa.int64()),
                    "fill_val": pa.array([], pa.float64()),
                }
            )
        d = np.where(has, dists, 1)
        rr, cc = np.nonzero(fill)
        # Overflow guard: big_d = prod(d) <= max_dist^8 and
        # num <= 8 * |v|max * big_d; int64 wraps silently, so when the
        # bound cannot be certified, fall back to exact Python ints for
        # just the filled cells (rare: max_dist ~> 20 with large values).
        vm = int(np.abs(vals).max(initial=0))
        if 8 * vm * (max_dist ** 8) < 2 ** 63 and max_dist ** 8 < 2 ** 62:
            big_d = np.prod(d, axis=0)  # exact in int64 (certified above)
            w = np.where(has, big_d[None] // d, 0)
            num = (vals * w).sum(axis=0)
            den = w.sum(axis=0)
        else:
            num = np.zeros((th, tw), object)
            den = np.zeros((th, tw), object)
            for r, c in zip(rr.tolist(), cc.tolist()):
                ds_rc = [int(d[i, r, c]) for i in range(nd) if has[i, r, c]]
                vs_rc = [int(vals[i, r, c]) for i in range(nd)
                         if has[i, r, c]]
                bd = 1
                for dv in ds_rc:
                    bd *= dv
                num[r, c] = sum(v * (bd // dv)
                                for v, dv in zip(vs_rc, ds_rc))
                den[r, c] = sum(bd // dv for dv in ds_rc)
            # exact rationals may exceed int64: reduce by the gcd so the
            # (num, den) columns stay int64 while staying exact
            import math

            for r, c in zip(rr.tolist(), cc.tolist()):
                g = math.gcd(int(num[r, c]), int(den[r, c])) or 1
                num[r, c] //= g
                den[r, c] //= g
                if not (-2 ** 63 <= num[r, c] < 2 ** 63
                        and den[r, c] < 2 ** 63):
                    raise OverflowError(
                        "fillnodata: exact rational exceeds int64 even "
                        "after reduction; lower max_dist"
                    )
            num = num.astype(np.int64, copy=False) if len(rr) else \
                np.zeros((th, tw), np.int64)
            den = den.astype(np.int64, copy=False) if len(rr) else \
                np.ones((th, tw), np.int64)
        cells = _cell_ids(row0, col0, th, tw, n_cols).reshape(th, tw)
        return pa.table(
            {
                "cell": pa.array(cells[rr, cc], pa.int64()),
                "row": pa.array(rr + row0, pa.int64()),
                "col": pa.array(cc + col0, pa.int64()),
                "num": pa.array(num[rr, cc], pa.int64()),
                "den": pa.array(den[rr, cc], pa.int64()),
                "fill_val": pa.array(
                    num[rr, cc] / den[rr, cc], pa.float64()
                ),
            }
        )

    return _run_focal(raster, window_fn, broadcast_cap, k=k)
