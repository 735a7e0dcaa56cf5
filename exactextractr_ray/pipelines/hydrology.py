"""Flow accumulation over the D8 flow-direction forest (ESRI
FlowAccumulation / GRASS r.watershed accumulation).

``flow_direction_d8`` points every cell with a strictly positive drop at
its steepest downslope neighbor, so the flow graph is a FOREST of
strictly-decreasing paths — acyclic by construction. The distributed
shape has two stages, and only (cell, succ) EDGE rows ever shuffle —
never raster tiles:

1. **basin labeling**: weakly-connected components of the forest via the
   existing Hash-to-Min propagation (``stages/dedup.py:dup_clusters``,
   Rastogi et al.) — O(log diameter) rounds of coarse-grouped segmented
   reduces. Every cell (self-loops included) gets its drainage-basin id.
2. **per-basin fold**: ``groupby(basin).map_groups`` — a basin contains
   ALL of its cells' upstream dependencies by definition, so each group
   runs the exact topological (Kahn) wavefront locally, vectorized
   (np.add.at per round); basins are independent and embarrassingly
   parallel. Rounds inside a group are bounded by the basin's relief
   (every D8 step strictly decreases an integer value), not its area.

Skew: one continental basin lands in one group — the documented
mitigation is Barnes (2016) tile-boundary-graph accumulation, which
decomposes exactly this fold; the semantics here are its ground truth.

NODATA: cells with NaN VALUE are dropped from the output by a final
node join; valid cells with a poisoned D8 window (NaN flowdir) are
sinks that still receive upstream counts (a valid cell never points at
a NODATA neighbor — its own window would be poisoned).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..sources.raster import RasterDataset
from ..stages.dedup import dup_clusters
from .focal import _D8, flow_direction_d8


def _kahn_fold(cell: np.ndarray, succ: np.ndarray) -> np.ndarray:
    """Exact topological accumulation within one basin. Returns acc
    (including self) aligned with ``cell``."""
    order = np.argsort(cell)
    cell = cell[order]
    succ = succ[order]
    n = len(cell)
    sidx = np.searchsorted(cell, succ)
    has = succ >= 0
    # guard: succ must be a present cell when >= 0 (true by construction)
    sidx = np.where(has, np.clip(sidx, 0, n - 1), -1)
    has &= (sidx >= 0) & (cell[np.maximum(sidx, 0)] == succ)
    indeg = np.zeros(n, np.int64)
    np.add.at(indeg, sidx[has], 1)
    acc = np.ones(n, np.int64)
    done = np.zeros(n, bool)
    while True:
        frontier = (indeg == 0) & ~done
        if not frontier.any():
            break
        done |= frontier
        f = np.flatnonzero(frontier)
        f = f[has[f]]
        np.add.at(acc, sidx[f], acc[f])
        np.subtract.at(indeg, sidx[f], 1)
    if not done.all():  # pragma: no cover - D8 graphs are acyclic
        raise RuntimeError("flow graph did not converge (cycle?)")
    out = np.empty(n, np.int64)
    out[order] = acc
    return out


def _labeled_edges(raster: RasterDataset):
    """Shared D8 plumbing: (cell, succ, basin) edge Dataset (self-loop for
    cells without descent, so every flowdir cell gets a basin label via
    Hash-to-Min), plus a (cell,) Dataset of valid-value nodes and the
    join partition count."""
    n_cols = raster.grid.ncol
    code_to_off = {code: (dr, dc) for code, dr, dc in _D8}

    fd = flow_direction_d8(raster)

    def to_edges(batch: pa.Table) -> pa.Table:
        cell = batch.column("cell").to_numpy().astype(np.int64)
        flow = batch.column("flowdir").to_numpy()
        r = cell // n_cols
        c = cell % n_cols
        succ = cell.copy()  # self-loop default: every node gets labeled
        for code, (dr, dc) in code_to_off.items():
            m = flow == float(code)
            succ[m] = (r[m] + dr) * n_cols + (c[m] + dc)
        return pa.table(
            {
                "cell": pa.array(cell, pa.int64()),
                "succ": pa.array(succ, pa.int64()),
            }
        )

    edges = fd.map_batches(to_edges, batch_format="pyarrow")
    basins = dup_clusters(edges, "cell", "succ")  # (doc_id, cluster_id)

    def relabel(t: pa.Table) -> pa.Table:
        return t.rename_columns(["cell", "basin"])

    ncpu = int(ray.cluster_resources().get("CPU", 8))
    nparts = max(2, min(16, ncpu // 2))
    labeled = edges.join(
        basins.map_batches(relabel, batch_format="pyarrow"),
        join_type="inner",
        num_partitions=nparts,
        on=("cell",),
    )

    def node_rows(batch: pa.Table) -> pa.Table:
        out_cells = []
        vals = batch.column("values")
        row0s = batch.column("row0").to_numpy()
        col0s = batch.column("col0").to_numpy()
        ths = batch.column("th").to_numpy()
        tws = batch.column("tw").to_numpy()
        layers = batch.column("layer").to_pylist()
        for i, lay in enumerate(layers):
            if lay != "value":
                continue
            v = np.asarray(vals[i].values, dtype=np.float64).reshape(
                int(ths[i]), int(tws[i])
            )
            rr = np.arange(row0s[i], row0s[i] + ths[i], dtype=np.int64)[:, None]
            cc = np.arange(col0s[i], col0s[i] + tws[i], dtype=np.int64)[None, :]
            ids = rr * n_cols + cc
            out_cells.append(ids[~np.isnan(v)])
        cells = np.concatenate(out_cells) if out_cells else np.empty(0, np.int64)
        return pa.table({"cell": pa.array(cells, pa.int64())})

    nodes = raster.ds.map_batches(node_rows, batch_format="pyarrow")
    return labeled, nodes, nparts


def flow_accumulation_d8(raster: RasterDataset):
    """Returns a Dataset of (cell:int64, n_upstream:int64) over all cells
    with a valid value — n_upstream is the ESRI-style count of upstream
    cells (excluding the cell itself)."""
    labeled, nodes, nparts = _labeled_edges(raster)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        cell = df["cell"].to_numpy(np.int64)
        succ = df["succ"].to_numpy(np.int64)
        succ = np.where(succ == cell, -1, succ)  # drop self-loops
        acc = _kahn_fold(cell, succ)
        return pd.DataFrame({"cell": cell, "n_upstream": acc - 1})

    folded = labeled.groupby("basin").map_groups(fold, batch_format="pandas")

    # drop NODATA-value cells (they carry a flowdir row but are not nodes)
    return folded.join(
        nodes, join_type="inner", num_partitions=nparts, on=("cell",)
    )


def watershed_basins(raster: RasterDataset):
    """Watershed / basin delineation (ESRI Basin tool): every valid cell
    labeled with its drainage basin — in a D8 forest the weakly-connected
    component IS the set of cells draining to one sink, so the
    Hash-to-Min component label (the smallest cell id in the basin) is
    the basin id. Returns (cell:int64, basin_id:int64)."""
    labeled, nodes, nparts = _labeled_edges(raster)

    def project(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "cell": t.column("cell").cast(pa.int64()),
                "basin_id": t.column("basin").cast(pa.int64()),
            }
        )

    lab = labeled.map_batches(project, batch_format="pyarrow")
    return lab.join(nodes, join_type="inner", num_partitions=nparts, on=("cell",))


def _strahler_fold(cell: np.ndarray, succ: np.ndarray) -> np.ndarray:
    """Strahler stream order within one basin: leaves are order 1;
    order(v) = max(child orders) + 1 if >= 2 children attain the max,
    else the max. Same topological wavefront as _kahn_fold; per round the
    frontier's pushes are grouped per target (sort + reduceat) so the
    (max, count-of-max) merge stays vectorized."""
    order_idx = np.argsort(cell)
    cell = cell[order_idx]
    succ = succ[order_idx]
    n = len(cell)
    sidx = np.searchsorted(cell, succ)
    has = succ >= 0
    sidx = np.where(has, np.clip(sidx, 0, n - 1), -1)
    has &= (sidx >= 0) & (cell[np.maximum(sidx, 0)] == succ)
    indeg = np.zeros(n, np.int64)
    np.add.at(indeg, sidx[has], 1)
    best = np.zeros(n, np.int64)  # max child order seen so far
    cnt = np.zeros(n, np.int64)  # children attaining that max
    ord_ = np.zeros(n, np.int64)
    done = np.zeros(n, bool)
    while True:
        frontier = (indeg == 0) & ~done
        if not frontier.any():
            break
        done |= frontier
        f = np.flatnonzero(frontier)
        ord_[f] = np.where(cnt[f] >= 2, best[f] + 1, np.maximum(best[f], 1))
        f = f[has[f]]
        if len(f):
            tgt = sidx[f]
            push = ord_[f]
            o = np.argsort(tgt, kind="stable")
            tgt, push = tgt[o], push[o]
            seg = np.flatnonzero(np.r_[True, tgt[1:] != tgt[:-1]])
            uniq = tgt[seg]
            rmax = np.maximum.reduceat(push, seg)
            # count of pushes equal to the round max, per target
            ends = np.r_[seg[1:], len(tgt)]
            rcnt = np.add.reduceat(
                (push == np.repeat(rmax, ends - seg)).astype(np.int64), seg
            )
            newer = rmax > best[uniq]
            same = rmax == best[uniq]
            cnt[uniq] = np.where(
                newer, rcnt, np.where(same, cnt[uniq] + rcnt, cnt[uniq])
            )
            best[uniq] = np.maximum(best[uniq], rmax)
            np.subtract.at(indeg, tgt, 1)
    if not done.all():  # pragma: no cover - D8 graphs are acyclic
        raise RuntimeError("flow graph did not converge (cycle?)")
    out = np.empty(n, np.int64)
    out[order_idx] = ord_
    return out


def strahler_order_d8(raster: RasterDataset):
    """Strahler stream order over the D8 forest (GRASS r.stream.order):
    same distributed shape as flow accumulation — basin labeling then a
    per-basin parallel wavefront fold. Returns (cell:int64,
    strahler:int64) over valid-value cells."""
    labeled, nodes, nparts = _labeled_edges(raster)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        cell = df["cell"].to_numpy(np.int64)
        succ = df["succ"].to_numpy(np.int64)
        succ = np.where(succ == cell, -1, succ)
        return pd.DataFrame({"cell": cell, "strahler": _strahler_fold(cell, succ)})

    folded = labeled.groupby("basin").map_groups(fold, batch_format="pandas")
    return folded.join(
        nodes, join_type="inner", num_partitions=nparts, on=("cell",)
    )
