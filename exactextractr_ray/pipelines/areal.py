"""Areal interpolation: area-weighted transfer of an extensive variable
from SOURCE zones to TARGET zones (the population-reaggregation /
dasymetric workflow exactextractr users run between admin levels).

    est(t) = sum_s  val(s) * area(s ∩ t) / area(s)

Ray-Data shape: targets stream as a Dataset; the source zone table (the
small side) is broadcast ONCE via ``ray.put`` and read per task — each
target batch computes its full estimate vectorized against all sources
(numpy outer interval intersections), so there is NO shuffle at all.
When both sides are large, range-partition both zone sets by a coarse
grid key and run this kernel per bucket (the
``pipelines/zonal_partitioned.py`` hash-join pattern).

Determinism contract (the repo-wide fixed-point pattern, cf.
stages/dsir.py / stages/lm.py): zone rectangles are quarter-cell aligned,
so in QUARTER-CELL integer coordinates every intersection area is an
exact int64 (quarter-cells squared) and each source contribution is the
exact integer ``(val * isect_q << SCALE_BITS) // src_q``; the per-target
sum of int64s is order-independent, so any parallelism and any SQL
aggregation order produce bit-identical results. ``est_fp / 2^SCALE_BITS``
recovers the float estimate to ~1e-6 relative.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

SCALE_BITS = 20


def areal_interpolate(targets, src_rects_q: np.ndarray, src_vals: np.ndarray):
    """``targets``: Dataset with columns (tgt_id:int64, x0q, y0q, x1q, y1q
    int64 quarter-cell coords). ``src_rects_q``: (S, 4) int64 array of
    source (x0q, y0q, x1q, y1q). ``src_vals``: (S,) int64 integer values.

    Returns a Dataset of (tgt_id:int64, est_fp:int64, covered_q:int64,
    n_src:int64) — est_fp is the fixed-point estimate (<< SCALE_BITS),
    covered_q the intersected area in quarter-cells^2, n_src the number of
    contributing sources. Targets intersecting no source keep zeros.
    """
    src_rects_q = np.asarray(src_rects_q, dtype=np.int64)
    src_vals = np.asarray(src_vals, dtype=np.int64)
    src_area_q = (src_rects_q[:, 2] - src_rects_q[:, 0]) * (
        src_rects_q[:, 3] - src_rects_q[:, 1]
    )
    if (src_area_q <= 0).any():
        raise ValueError("degenerate source zone")
    ref = ray.put((src_rects_q, src_vals, src_area_q))

    def per_batch(batch: pa.Table) -> pa.Table:
        rects, vals, areas = ray.get(ref)
        tid = batch.column("tgt_id").to_numpy()
        tx0 = batch.column("x0q").to_numpy()[:, None]
        ty0 = batch.column("y0q").to_numpy()[:, None]
        tx1 = batch.column("x1q").to_numpy()[:, None]
        ty1 = batch.column("y1q").to_numpy()[:, None]
        iw = np.minimum(tx1, rects[None, :, 2]) - np.maximum(tx0, rects[None, :, 0])
        ih = np.minimum(ty1, rects[None, :, 3]) - np.maximum(ty0, rects[None, :, 1])
        isect = np.maximum(iw, 0) * np.maximum(ih, 0)  # (B, S) int64
        contrib = (vals[None, :] * isect << SCALE_BITS) // areas[None, :]
        hit = isect > 0
        return pa.table(
            {
                "tgt_id": pa.array(tid, pa.int64()),
                "est_fp": pa.array(
                    np.where(hit, contrib, 0).sum(axis=1), pa.int64()
                ),
                "covered_q": pa.array(isect.sum(axis=1), pa.int64()),
                "n_src": pa.array(hit.sum(axis=1).astype(np.int64), pa.int64()),
            }
        )

    return targets.map_batches(per_batch, batch_format="pyarrow")
