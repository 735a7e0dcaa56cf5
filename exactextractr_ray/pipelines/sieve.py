"""Raster sieve filter — ``gdal_sieve.py``-style semantics: connected regions
smaller than a threshold are merged into a neighboring region, the
standard cleanup pass after classification.

Semantics (deterministic, documented — a GDAL-STYLE smallest-first merge
order, self-defined here rather than pinned to gdal_sieve's exact
tie-breaking, which is unspecified on ties / multi-pass growth):
repeatedly take the SMALLEST under-threshold component
(ties -> smallest component id) and merge it into the neighbor chosen
by (largest size, then smallest component id); merging contracts the
component graph (sizes add, borders union), so a merge can lift its
absorber over the threshold — exactly why processing is
smallest-first-with-recontraction rather than one batch pass.
4-adjacency, same-value regions, NaN cells are untouched background.

Distributed shape: everything per-cell rides :func:`polygonize.labeled_runs`
(runs shuffle, never cells). The sieve then needs only the COMPONENT
GRAPH — (size, val) per component and shared-border lengths per
adjacent pair — which is output-sized (O(components)), the same bound
as vectorize_components' per-component rows. Sizes come from one
groupby-sum; adjacency from band-grouped label painting (each band a
bounded (band_rows+1) x ncol canvas) + vectorized row/col shifts. The
merge loop runs on that graph (driver-side, bounded), and the final
relabel map broadcasts back over the run table via task closure — the
raster's cells are never collected.

The single-process reference (``sieve_reference``) labels the full
array by BFS and shares ONLY the merge-plan function; the distributed
result must match it cell-for-cell (verified by the ``sieve_raster``
special check and tests).
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
import pyarrow as pa

from ..sources.raster import RasterDataset
from .polygonize import labeled_runs


def _sieve_merge_plan(
    sizes: dict, borders: dict, threshold: int
) -> dict:
    """Component graph -> {component_id: absorbing component_id (final)}.

    ``borders`` maps undirected pairs (a, b), a < b -> shared border
    length (only adjacency matters for the plan; lengths are kept for
    introspection). Smallest-first with recontraction; deterministic.
    """
    nbrs: dict = {c: set() for c in sizes}
    for (a, b) in borders:
        nbrs[a].add(b)
        nbrs[b].add(a)
    parent = {c: c for c in sizes}

    def find(c):
        while parent[c] != c:
            parent[c] = parent[parent[c]]
            c = parent[c]
        return c

    heap = [(sz, c) for c, sz in sizes.items() if sz < threshold]
    heapq.heapify(heap)
    while heap:
        sz, c = heapq.heappop(heap)
        if find(c) != c or sizes[c] != sz or sz >= threshold:
            continue  # stale entry (already merged or grown)
        cand = {find(n) for n in nbrs[c]} - {c}
        if not cand:
            continue  # isolated small region keeps its value (GDAL too)
        tgt = min(cand, key=lambda n: (-sizes[n], n))
        parent[c] = tgt
        sizes[tgt] += sizes[c]
        nbrs[tgt] |= {find(n) for n in nbrs[c]} - {tgt, c}
        for n in list(nbrs[c]):
            fn = find(n)
            if fn not in (tgt, c):
                nbrs[fn].discard(c)
                nbrs[fn].add(tgt)
        if sizes[tgt] < threshold:
            heapq.heappush(heap, (sizes[tgt], tgt))
    return {c: find(c) for c in sizes}


def sieve_raster(
    rds: RasterDataset,
    threshold: int,
    layer: str = "value",
    band_rows: int = 16,
):
    """Distributed sieve -> pandas DataFrame of runs ``(row, col_start,
    col_end, val)`` of the SIEVED raster (NaN cells omitted), sorted.
    Matches :func:`sieve_reference` cell-for-cell."""
    ncol = rds.grid.ncol
    lr = labeled_runs(rds, layer=layer, band_rows=band_rows).materialize()

    # component sizes + values: one tiny groupby
    def size_part(b: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "component_id": b.column("component_id").to_numpy(),
                "val": b.column("val").to_numpy(),
                "n_cells": b.column("run_len").to_numpy().astype(np.int64),
            }
        )
        return pa.Table.from_pandas(
            df.groupby(["component_id", "val"], as_index=False).sum(),
            preserve_index=False,
        )

    comp = (
        lr.map_batches(size_part, batch_format="pyarrow")
        .groupby(["component_id", "val"])
        .sum("n_cells")
        .to_pandas()
    )
    comp.columns = ["component_id", "val", "n_cells"]

    # adjacency: paint labels per row band (+1 halo row) and shift
    def band_rows_out(b: pa.Table) -> pa.Table:
        rows = b.column("row").to_numpy()
        bands = rows // band_rows
        prev = (rows - 1) // band_rows  # also feed the band above
        t = pa.table(
            {
                "band": pa.array(bands, pa.int64()),
                "row": b.column("row"),
                "col_start": b.column("col_start"),
                "col_end": b.column("col_end"),
                "component_id": b.column("component_id"),
            }
        )
        dup = bands != prev
        if np.any(dup):
            d = b.filter(pa.array(dup))
            t2 = pa.table(
                {
                    "band": pa.array(prev[dup], pa.int64()),
                    "row": d.column("row"),
                    "col_start": d.column("col_start"),
                    "col_end": d.column("col_end"),
                    "component_id": d.column("component_id"),
                }
            )
            t = pa.concat_tables([t, t2])
        return t

    def band_adjacency(g: pd.DataFrame) -> pd.DataFrame:
        band = int(g["band"].iloc[0])
        if band < 0:
            return pd.DataFrame({"a": [], "b": [], "shared": []})
        r0 = band * band_rows
        h = band_rows + 1
        canvas = np.full((h, ncol), -1, np.int64)
        rows = g["row"].to_numpy() - r0
        cs = g["col_start"].to_numpy()
        ce = g["col_end"].to_numpy()
        cid = g["component_id"].to_numpy()
        for r, a, b, c in zip(rows, cs, ce, cid):
            if 0 <= r < h:
                canvas[r, a:b + 1] = c
        pairs = []
        # vertical adjacency inside the band window (rows r0..r0+band_rows)
        up, dn = canvas[:-1].ravel(), canvas[1:].ravel()
        m = (up >= 0) & (dn >= 0) & (up != dn)
        if np.any(m):
            pairs.append(np.stack([up[m], dn[m]], axis=1))
        # horizontal adjacency (exclude the halo row: it belongs to the
        # next band's window as its own row 0)
        le = canvas[:band_rows, :-1].ravel()
        ri = canvas[:band_rows, 1:].ravel()
        m = (le >= 0) & (ri >= 0) & (le != ri)
        if np.any(m):
            pairs.append(np.stack([le[m], ri[m]], axis=1))
        if not pairs:
            return pd.DataFrame({"a": [], "b": [], "shared": []})
        pr = np.concatenate(pairs)
        a = np.minimum(pr[:, 0], pr[:, 1])
        b = np.maximum(pr[:, 0], pr[:, 1])
        df = pd.DataFrame({"a": a, "b": b, "shared": 1})
        return df.groupby(["a", "b"], as_index=False).sum()

    adj = (
        lr.map_batches(band_rows_out, batch_format="pyarrow")
        .groupby("band")
        .map_groups(band_adjacency, batch_format="pandas")
    ).to_pandas()
    if len(adj):
        adj = adj.groupby(["a", "b"], as_index=False).sum()

    sizes = dict(zip(comp["component_id"].astype(int),
                     comp["n_cells"].astype(int)))
    vals = dict(zip(comp["component_id"].astype(int), comp["val"]))
    borders = {
        (int(r.a), int(r.b)): int(r.shared) for r in adj.itertuples()
    } if len(adj) else {}
    plan = _sieve_merge_plan(sizes, borders, threshold)
    final_val = {c: vals[plan[c]] for c in plan}

    def relabel(b: pa.Table) -> pa.Table:
        cid = b.column("component_id").to_numpy()
        v = np.array([final_val[int(c)] for c in cid], np.float64)
        return pa.table(
            {
                "row": b.column("row"),
                "col_start": b.column("col_start"),
                "col_end": b.column("col_end"),
                "val": pa.array(v, pa.float64()),
            }
        )

    out = lr.map_batches(relabel, batch_format="pyarrow").to_pandas()
    out = out.sort_values(["row", "col_start"]).reset_index(drop=True)
    # merge now-adjacent same-value runs within each row so output is
    # canonical (run decomposition of the sieved raster)
    merged_rows = []
    for row, gdf in out.groupby("row", sort=True):
        cs = gdf["col_start"].to_numpy()
        ce = gdf["col_end"].to_numpy()
        vv = gdf["val"].to_numpy()
        i = 0
        while i < len(cs):
            j = i
            while (j + 1 < len(cs) and cs[j + 1] == ce[j] + 1
                   and vv[j + 1] == vv[i]):
                j += 1
            merged_rows.append((int(row), int(cs[i]), int(ce[j]),
                                float(vv[i])))
            i = j + 1
    return pd.DataFrame(
        merged_rows, columns=["row", "col_start", "col_end", "val"]
    )


def sieve_reference(
    cost: np.ndarray, threshold: int
) -> np.ndarray:
    """Single-process reference: BFS component labeling on the full
    array, adjacency via shifts, the SAME merge plan, painted result."""
    h, w = cost.shape
    valid = np.isfinite(cost)
    label = np.full((h, w), -1, np.int64)
    sizes: dict = {}
    vals: dict = {}
    for r in range(h):
        for c in range(w):
            if not valid[r, c] or label[r, c] >= 0:
                continue
            lid = r * w + c
            stack = [(r, c)]
            label[r, c] = lid
            n = 0
            while stack:
                rr, cc = stack.pop()
                n += 1
                for dr, dc in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                    nr, nc = rr + dr, cc + dc
                    if (0 <= nr < h and 0 <= nc < w and valid[nr, nc]
                            and label[nr, nc] < 0
                            and cost[nr, nc] == cost[r, c]):
                        label[nr, nc] = lid
                        stack.append((nr, nc))
            sizes[lid] = n
            vals[lid] = float(cost[r, c])
    borders: dict = {}

    def add_pairs(x, y):
        m = (x >= 0) & (y >= 0) & (x != y)
        for a, b in zip(x[m], y[m]):
            key = (int(min(a, b)), int(max(a, b)))
            borders[key] = borders.get(key, 0) + 1

    add_pairs(label[:-1].ravel(), label[1:].ravel())
    add_pairs(label[:, :-1].ravel(), label[:, 1:].ravel())
    plan = _sieve_merge_plan(sizes, borders, threshold)
    out = cost.copy()
    for r in range(h):
        for c in range(w):
            if valid[r, c]:
                out[r, c] = vals[plan[int(label[r, c])]]
    return out


def runs_to_array(df: pd.DataFrame, shape: tuple[int, int]) -> np.ndarray:
    """Sieved run table -> full array (NaN background) for comparisons."""
    out = np.full(shape, np.nan)
    for r in df.itertuples():
        out[int(r.row), int(r.col_start):int(r.col_end) + 1] = r.val
    return out
