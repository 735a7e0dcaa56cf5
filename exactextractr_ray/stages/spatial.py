"""Spatial indexing + search operators beyond point-in-polygon: hierarchical
space-filling-curve keys (Hilbert — the S2-style locality index), hexagonal
binning (the H3-style cell shape), spatial k-nearest-neighbor join, polygon
cell cover (polyfill), and k-ring neighborhood aggregation.

These complete the north-rule surface ("H3/S2 index, point-in-polygon, kNN")
next to stages/geocode.py (flat cells + Morton) and stages/pip_join.py. All
are Ray-Data-first:

* key assignment is a stateless vectorized ``map_batches`` over zero-copy
  Arrow (pure integer/float numpy, bit-identical at any parallelism);
* spatial kNN is the broadcast pattern (queries ``ray.put`` once, per-batch
  vectorized distances + deterministic partial top-k, tiny finalize) — the
  same shuffle shape as stages/knn.py: O(Q * k * num_batches) rows move,
  never the corpus;
* polyfill fans out zones (the SMALL side) to (zone_id, cell) rows with a
  fully vectorized multi-range expansion — at 100 TB this is the build step
  for a cell->zone broadcast join that replaces a geometry shuffle;
* k-ring aggregation is a tagged self-union + ONE groupby over cell keys
  (counts rows only — bounded by distinct occupied cells, never documents).

Reference surface: exactextractr has no spatial-index analog (it reads
zones feature-by-feature, /root/reference/src/exactextract/src/
gdal_dataset_wrapper.cpp:22-76); these operators are the web-scale
tiling/partitioning machinery BASELINE.json's north star adds on top.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray


# ---------------- Hilbert-curve key (S2-style) ----------------


def hilbert_cell(lon: np.ndarray, lat: np.ndarray, level: int = 8) -> np.ndarray:
    """Hilbert-curve index of the 2^level x 2^level cell containing each
    point — the S2-style spatial key: unlike Morton (geocode.morton_cell),
    consecutive indexes are always edge-adjacent cells, so range-partitioning
    by key gives compact (low-perimeter) worker regions. Parent cell at
    level-1 is ``id >> 2`` (same prefix-coarsening contract as Morton).

    Classic xy2d bit transform (public domain, en.wikipedia.org/wiki/
    Hilbert_curve), vectorized: one numpy pass per level, no Python per row.
    Bit-identical to synth.hilbert_cell_sql's unrolled-CTE oracle.
    """
    n = np.int64(1) << level
    x = np.clip(
        np.floor((np.asarray(lon) + 180.0) / 360.0 * n).astype(np.int64), 0, n - 1
    )
    y = np.clip(
        np.floor((np.asarray(lat) + 90.0) / 180.0 * n).astype(np.int64), 0, n - 1
    )
    d = np.zeros(len(x), dtype=np.int64)
    s = np.int64(n >> 1)
    while s > 0:
        rx = (x // s) % 2
        ry = (y // s) % 2
        d += s * s * ((3 * rx) ^ ry)
        # rotate/flip the quadrant frame (ry==0: swap axes, rx==1: also flip)
        x_new = np.where(ry == 1, x, np.where(rx == 1, n - 1 - y, y))
        y_new = np.where(ry == 1, y, np.where(rx == 1, n - 1 - x, x))
        x, y = x_new, y_new
        s >>= 1
    return d


def assign_hilbert_batch(batch: pa.Table, level: int = 8) -> pa.Table:
    lon = batch.column("lon").to_numpy()
    lat = batch.column("lat").to_numpy()
    return batch.append_column(
        "hilbert_cell", pa.array(hilbert_cell(lon, lat, level), type=pa.int64())
    )


# ---------------- hexagonal binning (H3-style) ----------------


def hex_cell(lon: np.ndarray, lat: np.ndarray, size: float = 4.0) -> np.ndarray:
    """Pointy-top hexagon id containing each point (H3-style bin; flat
    lon/lat plane — no icosahedron projection in this env, FIXTURES.md §1).

    Assignment is nearest-hex-center over the 9 lattice candidates around
    the point's bounding rectangle — the Voronoi diagram of the hex lattice
    IS the hex grid, so this is exact by definition, needs no irrational
    axial transform, and every float op mirrors hex_cell_sql term-for-term
    (ties broken by smallest (row, col), matching the oracle's ROW_NUMBER).
    Lattice: row r centers at y = r*1.5*size; col c centers at
    x = c*w + (r odd)*w/2 with w = sqrt(3)*size. id = r * 2^20 + c.
    """
    w = np.sqrt(3.0) * size
    halfw = np.sqrt(3.0) * size * 0.5
    ystep = 1.5 * size
    x = np.asarray(lon, dtype=np.float64) + 180.0
    y = np.asarray(lat, dtype=np.float64) + 90.0
    r0 = np.floor(y / ystep).astype(np.int64)
    c0 = np.floor(x / w).astype(np.int64)
    best_d2 = np.full(len(x), np.inf)
    best_r = np.zeros(len(x), dtype=np.int64)
    best_c = np.zeros(len(x), dtype=np.int64)
    # candidate order (r asc, c asc) + strict < keeps the first minimum:
    # identical tie-break to the oracle's ORDER BY d2, r, c
    for dr in (-1, 0, 1):
        for dc in (-1, 0, 1):
            r = r0 + dr
            c = c0 + dc
            parity = np.mod(r, 2).astype(np.float64)
            cx = c.astype(np.float64) * w + parity * halfw
            cy = r.astype(np.float64) * ystep
            ddx = x - cx
            ddy = y - cy
            d2 = ddx * ddx + ddy * ddy
            take = d2 < best_d2
            best_d2 = np.where(take, d2, best_d2)
            best_r = np.where(take, r, best_r)
            best_c = np.where(take, c, best_c)
    return best_r * 1048576 + best_c


def assign_hex_batch(batch: pa.Table, size: float = 4.0) -> pa.Table:
    lon = batch.column("lon").to_numpy()
    lat = batch.column("lat").to_numpy()
    return batch.append_column(
        "hex_cell", pa.array(hex_cell(lon, lat, size), type=pa.int64())
    )


# ---------------- spatial kNN join ----------------


class _SpatialTopK:
    """Actor stage: batch points x broadcast query points -> candidate rows.
    Same broadcast/partial-top-k shape as knn.BruteForceTopK, with planar
    squared euclidean distance (bit-exact in SQL: the synthetic lon/lat
    plane is the distance space; no great-circle transcendentals)."""

    def __init__(self, queries_ref, k: int, id_col: str):
        q = ray.get(queries_ref) if not isinstance(queries_ref, tuple) else queries_ref
        self.query_ids, self.qlon, self.qlat = q
        self.k = k
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_numpy().astype(np.int64)
        lon = batch.column("lon").to_numpy()
        lat = batch.column("lat").to_numpy()
        if len(ids) == 0:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "neighbor_id": pa.array([], pa.int64()),
                    "dist2": pa.array([], pa.float64()),
                }
            )
        dx = lon[:, None] - self.qlon[None, :]
        dy = lat[:, None] - self.qlat[None, :]
        d2 = dx * dx + dy * dy  # (B, Q)
        kk = min(self.k, d2.shape[0])
        parts_q, parts_n, parts_d = [], [], []
        for qi in range(d2.shape[1]):
            col = d2[:, qi]
            if kk < len(col):
                # deterministic cut: (dist2 asc, neighbor_id asc) — identical
                # to the finalize ordering, so per-batch capping never changes
                # the global top-k
                ord_ = np.lexsort((ids, col))[:kk]
            else:
                ord_ = np.arange(len(col))
            parts_q.append(np.full(len(ord_), int(self.query_ids[qi]), np.int64))
            parts_n.append(ids[ord_])
            parts_d.append(col[ord_])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(parts_q), pa.int64()),
                "neighbor_id": pa.array(np.concatenate(parts_n), pa.int64()),
                "dist2": pa.array(np.concatenate(parts_d), pa.float64()),
            }
        )


def spatial_knn(
    ds,
    query_ids: np.ndarray,
    query_lon: np.ndarray,
    query_lat: np.ndarray,
    k: int = 5,
    id_col: str = "doc_id",
    exclude_self: bool = True,
):
    """k nearest points (planar squared distance on the lon/lat plane) for
    each query point — the spatial-join companion of knn.knn_cosine.

    Query points are broadcast once via ``ray.put``; the point corpus
    streams; each batch emits at most Q*(k+1) candidate rows; a tiny
    groupby(query_id) finalizes. Returns (query_id, neighbor_id, rank,
    dist2) ranked by (dist2 asc, neighbor_id asc).
    """
    from ..util import cached_stage

    queries_ref = ray.put(
        (
            np.asarray(query_ids, dtype=np.int64),
            np.asarray(query_lon, dtype=np.float64),
            np.asarray(query_lat, dtype=np.float64),
        )
    )
    cand = ds.map_batches(
        cached_stage(
            _SpatialTopK, queries_ref, k + (1 if exclude_self else 0), id_col
        ),
        batch_format="pyarrow",
        batch_size=8192,
    )

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        qid = int(g["query_id"].iloc[0])
        if exclude_self:
            g = g[g["neighbor_id"] != qid]
        g = g.sort_values(["dist2", "neighbor_id"], ascending=[True, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", "neighbor_id", "rank", "dist2"]]

    return cand.groupby("query_id").map_groups(final_topk, batch_format="pandas")


# ---------------- cell-partitioned spatial kNN (scale path) --------------


def build_cell_index(
    ds, out_dir: str, res_deg: float = 3.0, id_col: str = "doc_id"
) -> None:
    """Write the point corpus as parquet PARTITIONED BY flat cell id — the
    spatial analog of knn.build_ivf_index: queries later prune at the file
    list, so an exact kNN touches only the partitions its ring proof needs.

    A ``_cell_counts.json`` sidecar (per-cell row counts, computed by a tiny
    distributed count during the build) saves queries the per-file parquet
    footer scan — at real scale the index has millions of files and the
    sidecar turns query planning into one small JSON read."""
    import json
    import os

    from .geocode import assign_cell_batch

    ds.map_batches(
        lambda b: assign_cell_batch(b, res_deg), batch_format="pyarrow"
    ).write_parquet(out_dir, partition_cols=["cell"])
    # one footer sweep at BUILD time (amortized over every query)
    counts, _files = _scan_cell_partitions(out_dir)
    sidecar = {
        "res_deg": res_deg,
        "counts": {str(c): int(n) for c, n in counts.items()},
    }
    tmp = os.path.join(out_dir, "_cell_counts.json.tmp")
    with open(tmp, "w") as f:
        json.dump(sidecar, f)
    os.replace(tmp, os.path.join(out_dir, "_cell_counts.json"))


def _scan_cell_partitions(index_dir: str):
    """(cell -> row count, cell -> file list) from partition footers."""
    import glob as _glob
    import os

    import pyarrow.parquet as pq

    cell_counts: dict[int, int] = {}
    cell_files: dict[int, list[str]] = {}
    for d in sorted(_glob.glob(os.path.join(index_dir, "cell=*"))):
        cell = int(os.path.basename(d).split("=", 1)[1])
        files = sorted(_glob.glob(os.path.join(d, "*.parquet")))
        cell_files[cell] = files
        cell_counts[cell] = sum(
            pq.ParquetFile(f).metadata.num_rows for f in files
        )
    return cell_counts, cell_files


def spatial_knn_cells(
    index_dir: str,
    query_ids: np.ndarray,
    query_lon: np.ndarray,
    query_lat: np.ndarray,
    k: int = 5,
    res_deg: float = 3.0,
    id_col: str = "doc_id",
    exclude_self: bool = True,
):
    """EXACT k nearest neighbors over a cell-partitioned index, scanning only
    a proven-sufficient ring of partitions per query (storage-level pruning;
    the 100-TB path for spatial_knn).

    Ring proof: per-partition row counts come from parquet FOOTERS only (no
    data read). If the Chebyshev cell ring of radius r around a query holds
    >= k+1 points, every kNN distance is <= (r+1)*res*sqrt(2) (block
    diagonal), and any point OUTSIDE Chebyshev ring R is farther than R*res
    from the query (the scanned block contains the axis-aligned square of
    half-width R*res around it). Scanning R = ceil((r+1)*sqrt(2)) + 1 is
    therefore sufficient for exactness; the result equals spatial_knn's
    brute force bit-for-bit. One Ray scan reads the UNION of all queries'
    rings, so shared partitions are read once.
    """
    import glob as _glob
    import json
    import math
    import os

    import ray.data

    ncols = int(round(360.0 / res_deg))
    nrows = int(round(180.0 / res_deg))

    # metadata-only per-cell counts: the build-time sidecar when present
    # (one JSON read), else a parquet-footer sweep — never the data
    sidecar = os.path.join(index_dir, "_cell_counts.json")
    if os.path.exists(sidecar):
        with open(sidecar) as f:
            cell_counts = {
                int(c): int(n) for c, n in json.load(f)["counts"].items()
            }
        cell_files = {
            c: sorted(
                _glob.glob(os.path.join(index_dir, f"cell={c}", "*.parquet"))
            )
            for c in cell_counts
        }
    else:
        cell_counts, cell_files = _scan_cell_partitions(index_dir)
    total = sum(cell_counts.values())
    need = k + (1 if exclude_self else 0)

    qlon = np.asarray(query_lon, dtype=np.float64)
    qlat = np.asarray(query_lat, dtype=np.float64)
    qcx = np.floor((qlon + 180.0) / res_deg).astype(np.int64)
    qcy = np.floor((qlat + 90.0) / res_deg).astype(np.int64)

    def ring_cells(cy: int, cx: int, r: int) -> list[int]:
        out = []
        for y in range(max(cy - r, 0), min(cy + r, nrows - 1) + 1):
            for x in range(max(cx - r, 0), min(cx + r, ncols - 1) + 1):
                c = y * ncols + x
                if c in cell_files:
                    out.append(c)
        return out

    wanted: set[int] = set()
    max_r = max(nrows, ncols)
    for cy, cx in zip(qcy, qcx):
        if total <= need:
            wanted.update(cell_files)
            continue
        r = 0
        while r < max_r:
            cnt = sum(cell_counts[c] for c in ring_cells(int(cy), int(cx), r))
            if cnt >= need:
                break
            r += 1
        R = int(math.ceil((r + 1) * math.sqrt(2.0))) + 1
        wanted.update(ring_cells(int(cy), int(cx), R))

    files = [f for c in sorted(wanted) for f in cell_files[c]]
    if not files:
        import pandas as _pd

        return ray.data.from_pandas(
            _pd.DataFrame(
                {
                    "query_id": _pd.Series([], dtype=np.int64),
                    "neighbor_id": _pd.Series([], dtype=np.int64),
                    "rank": _pd.Series([], dtype=np.int64),
                    "dist2": _pd.Series([], dtype=np.float64),
                }
            )
        )
    pruned = ray.data.read_parquet(files, columns=[id_col, "lon", "lat"])
    return spatial_knn(
        pruned,
        np.asarray(query_ids, dtype=np.int64),
        qlon,
        qlat,
        k=k,
        id_col=id_col,
        exclude_self=exclude_self,
    )


# ---------------- polygon cell cover (polyfill) ----------------


def zone_cell_cover_batch(batch: pa.Table, res_deg: float = 3.0) -> pa.Table:
    """(zone_id, xmin, ymin, xmax, ymax) rows -> (zone_id, cell) rows for
    every res_deg cell whose rectangle intersects the (open) zone rectangle
    — the H3-polyfill analog over the flat cell grid (geocode.assign_cell).

    Fully vectorized multi-range expansion: no Python loop over zones. At
    scale this is the build side of a cell->zones broadcast/hash join: the
    cover (bounded by zone area / cell area) shuffles instead of geometry.
    """
    ncols = int(round(360.0 / res_deg))
    zid = batch.column("zone_id").to_numpy().astype(np.int64)
    xmin = batch.column("xmin").to_numpy()
    ymin = batch.column("ymin").to_numpy()
    xmax = batch.column("xmax").to_numpy()
    ymax = batch.column("ymax").to_numpy()
    cx0 = np.floor((xmin + 180.0) / res_deg).astype(np.int64)
    cx1 = np.ceil((xmax + 180.0) / res_deg).astype(np.int64) - 1
    cy0 = np.floor((ymin + 90.0) / res_deg).astype(np.int64)
    cy1 = np.ceil((ymax + 90.0) / res_deg).astype(np.int64) - 1
    ncx = np.maximum(cx1 - cx0 + 1, 0)
    ncy = np.maximum(cy1 - cy0 + 1, 0)
    counts = ncx * ncy
    total = int(counts.sum())
    if total == 0:
        return pa.table(
            {"zone_id": pa.array([], pa.int64()), "cell": pa.array([], pa.int64())}
        )
    rep = np.repeat(np.arange(len(zid)), counts)
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    within = np.arange(total) - starts[rep]
    cy = cy0[rep] + within // ncx[rep]
    cx = cx0[rep] + within % ncx[rep]
    return pa.table(
        {
            "zone_id": pa.array(zid[rep], pa.int64()),
            "cell": pa.array(cy * ncols + cx, pa.int64()),
        }
    )


def zone_cell_cover(zones_bounds_ds, res_deg: float = 3.0):
    """Dataset of zone bounds -> Dataset of (zone_id, cell) cover rows."""
    return zones_bounds_ds.map_batches(
        lambda b: zone_cell_cover_batch(b, res_deg), batch_format="pyarrow"
    )


# ---------------- cover-join: the zone_cell_cover consumer ----------------


def pip_join_cells(
    ds,
    zones_bounds: pa.Table,
    res_deg: float = 3.0,
    lon_col: str = "lon",
    lat_col: str = "lat",
):
    """Point-in-rectangle join through a CELL-COVER index: the polyfill
    (zone_cell_cover) of the zone envelopes becomes a CSR cell->zones index,
    broadcast once; each point probes only the zones covering ITS OWN cell
    (instead of envelope-testing every zone, pip_join's shape). Exact
    strict-interior semantics (lon > xmin and lon < xmax, same for lat),
    identical output to pip_join over rectangle zones.

    Scale shape: the index is bounded by the COVER size (zone area / cell
    area), not zones x points; candidates per point are the zones overlapping
    one cell — the same storage-pruning idea as spatial_knn_cells, applied
    to the join side. For non-rectangle zones the cover still prunes and an
    exact geometry test (stages/pip_join.py ray casting) takes over per
    candidate; rectangle bounds keep this variant fully vectorized.
    """
    from .. import synth

    cover = zone_cell_cover_batch(zones_bounds, res_deg)
    cells = cover.column("cell").to_numpy()
    zidx_of_cover = cover.column("zone_id").to_numpy()  # == zone INDEX here
    zid = zones_bounds.column("zone_id").to_numpy().astype(np.int64)
    # cover rows carry zone_id values; map them back to positional indices
    pos_of_id = {int(z): i for i, z in enumerate(zid)}
    zpos = np.array([pos_of_id[int(z)] for z in zidx_of_cover], dtype=np.int64)
    order = np.argsort(cells, kind="stable")
    cells_sorted = cells[order]
    zpos_sorted = zpos[order]
    uc, starts = np.unique(cells_sorted, return_index=True)
    ends = np.append(starts[1:], len(cells_sorted))
    xmin = zones_bounds.column("xmin").to_numpy()
    ymin = zones_bounds.column("ymin").to_numpy()
    xmax = zones_bounds.column("xmax").to_numpy()
    ymax = zones_bounds.column("ymax").to_numpy()
    index_ref = ray.put(
        (uc, starts, ends, zpos_sorted, xmin, ymin, xmax, ymax, zid, res_deg)
    )

    def probe(batch: pa.Table) -> pa.Table:
        uc_, s_, e_, zp_, x0, y0, x1, y1, ids, res = ray.get(index_ref)
        lon = batch.column(lon_col).to_numpy()
        lat = batch.column(lat_col).to_numpy()
        pc = synth.cell_for_lonlat(lon, lat, res)
        if len(uc_) == 0:
            empty = batch.take(pa.array([], pa.int64()))
            return empty.append_column("zone_id", pa.array([], pa.int64()))
        loc = np.clip(np.searchsorted(uc_, pc), 0, len(uc_) - 1)
        found = uc_[loc] == pc
        pts = np.nonzero(found)[0]
        if len(pts) == 0:
            empty = batch.take(pa.array([], pa.int64()))
            return empty.append_column("zone_id", pa.array([], pa.int64()))
        cs = s_[loc[pts]]
        ce = e_[loc[pts]]
        counts = ce - cs
        rows = np.repeat(pts, counts)
        # multi-range gather of candidate zone positions
        total = int(counts.sum())
        flat_start = np.concatenate(([0], np.cumsum(counts)[:-1]))
        within = np.arange(total) - flat_start[np.repeat(
            np.arange(len(pts)), counts
        )]
        zc = zp_[np.repeat(cs, counts) + within]
        m = (
            (lon[rows] > x0[zc])
            & (lon[rows] < x1[zc])
            & (lat[rows] > y0[zc])
            & (lat[rows] < y1[zc])
        )
        rows = rows[m]
        zones_hit = ids[zc[m]]
        ordr = np.lexsort((zones_hit, rows))
        out = batch.take(pa.array(rows[ordr]))
        return out.append_column(
            "zone_id", pa.array(zones_hit[ordr], pa.int64())
        )

    return ds.map_batches(probe, batch_format="pyarrow", batch_size=None)


# ---------------- k-ring neighborhood aggregation ----------------


def cell_kring_counts(geo_ds, res_deg: float = 3.0, coarse: int = 64):
    """Per-cell doc counts plus the ring-1 (3x3 neighborhood) total — the
    k-ring smoothing primitive of hex-grid systems, over the flat cell grid.

    Shape: corpus -> groupby(cell).count() (rows bounded by occupied cells,
    not documents) -> each count row fans out to its 9 neighbors tagged
    kind=0 plus itself tagged kind=1 -> ONE coarse-keyed groupby with a
    vectorized segmented-sum finalize. No wrap at the antimeridian (grid
    edges clamp, matching the oracle's plain integer adjacency).
    Returns (cell, n_docs, kring_docs) for every occupied cell.
    """
    ncols = int(round(360.0 / res_deg))
    counts = geo_ds.groupby("cell").count()

    def fan_out(batch: pa.Table) -> pa.Table:
        cell = batch.column("cell").to_numpy().astype(np.int64)
        n = batch.column("count()").to_numpy().astype(np.int64)
        cy = cell // ncols
        cx = cell % ncols
        offs = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
        tgt, val, kind = [], [], []
        for dy, dx in offs:
            ty = cy + dy
            tx = cx + dx
            ok = (ty >= 0) & (tx >= 0) & (tx < ncols)
            tgt.append((ty[ok] * ncols + tx[ok]))
            val.append(n[ok])
            kind.append(np.zeros(int(ok.sum()), dtype=np.int64))
        tgt.append(cell)
        val.append(n)
        kind.append(np.ones(len(cell), dtype=np.int64))
        t = np.concatenate(tgt)
        return pa.table(
            {
                "cell": pa.array(t, pa.int64()),
                "n": pa.array(np.concatenate(val), pa.int64()),
                "kind": pa.array(np.concatenate(kind), pa.int64()),
                "ckey": pa.array(t % coarse, pa.int64()),
            }
        )

    tagged = counts.map_batches(fan_out, batch_format="pyarrow")

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        cell = g["cell"].to_numpy()
        n = g["n"].to_numpy()
        kind = g["kind"].to_numpy()
        order = np.argsort(cell, kind="stable")
        cell, n, kind = cell[order], n[order], kind[order]
        uniq, starts = np.unique(cell, return_index=True)
        ring = np.add.reduceat(np.where(kind == 0, n, 0), starts)
        center = np.add.reduceat(np.where(kind == 1, n, 0), starts)
        has_center = np.add.reduceat(kind, starts) > 0
        return pd.DataFrame(
            {
                "cell": uniq[has_center],
                "n_docs": center[has_center].astype(np.int64),
                # kind=0 fan-out covers all 9 offsets incl. (0,0), so the
                # ring sum already contains the center cell's own count
                "kring_docs": ring[has_center].astype(np.int64),
            }
        )

    return tagged.groupby("ckey").map_groups(finalize, batch_format="pandas")


def distance_join(
    a_ds,
    b_ds,
    radius: float,
    res_deg: float | None = None,
    a_id: str = "doc_id",
    b_id: str = "qid",
    coarse: int = 64,
):
    """All (a, b) pairs within planar ``radius`` — the distributed radius
    join, with BOTH point sets streaming (neither side is broadcast).

    Shape: the A side bins once into cells of size >= radius; the B side
    replicates each point to its 3x3 neighbor cells (a bounded 9x fan-out
    of the SMALL columns only: id, lon, lat). One groupby on a coarse cell
    key co-locates each cell's A points with every B point whose disc can
    reach it; the per-cell candidate check is one vectorized (|A| x |B|)
    distance mask. Every qualifying pair appears exactly once because an A
    point's home cell is unique and ``radius <= cell size`` guarantees the
    matching B replica landed there.

    Skew: a hot cell costs |A_cell| x |B_ring| multiplies inside one task;
    for city-density corpora drop ``res_deg`` (more, smaller cells) — the
    fan-out stays 9x regardless. No antimeridian wrap (grid edges clamp),
    consistent with the other cell operators.

    Returns (a_id, b_id, dist2) with self-pairs (same id) excluded.
    """
    if res_deg is None:
        res_deg = float(radius)
    if radius > res_deg:
        raise ValueError("radius must be <= res_deg (cell size)")
    ncols = int(round(360.0 / res_deg))
    r2 = float(radius) * float(radius)

    def tag_a(batch: pa.Table) -> pa.Table:
        from ..synth import cell_for_lonlat

        lon = batch.column("lon").to_numpy()
        lat = batch.column("lat").to_numpy()
        cell = cell_for_lonlat(lon, lat, res_deg)
        return pa.table(
            {
                "cell": pa.array(cell, pa.int64()),
                "ckey": pa.array(cell % coarse, pa.int64()),
                "side": pa.array(np.zeros(len(lon), np.int8), pa.int8()),
                "pid": batch.column(a_id).cast(pa.int64()),
                "lon": pa.array(lon, pa.float64()),
                "lat": pa.array(lat, pa.float64()),
            }
        )

    def tag_b(batch: pa.Table) -> pa.Table:
        lon = batch.column("lon").to_numpy()
        lat = batch.column("lat").to_numpy()
        ids = batch.column(b_id).to_numpy().astype(np.int64)
        cy = np.floor((lat + 90.0) / res_deg).astype(np.int64)
        cx = np.floor((lon + 180.0) / res_deg).astype(np.int64)
        tcell, tid, tlon, tlat = [], [], [], []
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                ty, tx = cy + dy, cx + dx
                ok = (ty >= 0) & (tx >= 0) & (tx < ncols)
                tcell.append(ty[ok] * ncols + tx[ok])
                tid.append(ids[ok])
                tlon.append(lon[ok])
                tlat.append(lat[ok])
        cell = np.concatenate(tcell)
        return pa.table(
            {
                "cell": pa.array(cell, pa.int64()),
                "ckey": pa.array(cell % coarse, pa.int64()),
                "side": pa.array(np.ones(len(cell), np.int8), pa.int8()),
                "pid": pa.array(np.concatenate(tid), pa.int64()),
                "lon": pa.array(np.concatenate(tlon), pa.float64()),
                "lat": pa.array(np.concatenate(tlat), pa.float64()),
            }
        )

    tagged = a_ds.map_batches(tag_a, batch_format="pyarrow").union(
        b_ds.map_batches(tag_b, batch_format="pyarrow")
    )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        cell = g["cell"].to_numpy()
        side = g["side"].to_numpy()
        pid = g["pid"].to_numpy()
        lon = g["lon"].to_numpy()
        lat = g["lat"].to_numpy()
        order = np.argsort(cell, kind="stable")
        cell, side, pid, lon, lat = (
            cell[order],
            side[order],
            pid[order],
            lon[order],
            lat[order],
        )
        out_a, out_b, out_d = [], [], []
        uniq, starts = np.unique(cell, return_index=True)
        bounds = np.append(starts, len(cell))
        for s, e in zip(bounds[:-1], bounds[1:]):
            am = side[s:e] == 0
            bm = ~am
            if not am.any() or not bm.any():
                continue
            dlon = lon[s:e][am][:, None] - lon[s:e][bm][None, :]
            dlat = lat[s:e][am][:, None] - lat[s:e][bm][None, :]
            d2 = dlon * dlon + dlat * dlat
            hit = (d2 <= r2) & (pid[s:e][am][:, None] != pid[s:e][bm][None, :])
            ai, bi = np.nonzero(hit)
            out_a.append(pid[s:e][am][ai])
            out_b.append(pid[s:e][bm][bi])
            out_d.append(d2[ai, bi])
        if not out_a:
            return pd.DataFrame(
                {
                    a_id: np.empty(0, np.int64),
                    b_id: np.empty(0, np.int64),
                    "dist2": np.empty(0, np.float64),
                }
            )
        return pd.DataFrame(
            {
                a_id: np.concatenate(out_a),
                b_id: np.concatenate(out_b),
                "dist2": np.concatenate(out_d),
            }
        )

    return tagged.groupby("ckey").map_groups(pairs, batch_format="pandas")


def nearest_zone(
    points,
    zone_bounds,
    id_col: str = "doc_id",
):
    """Snap every point to its NEAREST rectangle zone (planar clamp
    distance; 0 inside a zone) — the point->polygon nearest-neighbor join
    that picks up points PIP joins drop (coastal/offshore geocodes).

    Zones are the small broadcast side: the per-batch kernel evaluates
    every zone's clamp distance vectorized (dx = max(0, xmin-x, x-xmax),
    dy likewise, d2 = dx*dx + dy*dy) and keeps the running (d2, zone_id)
    lexicographic minimum — ties break to the smallest zone_id, matching
    the SQL ROW_NUMBER oracle. Zero shuffle; one output row per point.

    At real-polygon scale the same shape holds with bounding-box clamp
    distance as the prune + the coverage kernel for exact distance; the
    rectangle case here IS the exact kernel.
    """
    zb = [(int(z), float(a), float(b), float(c), float(d))
          for z, a, b, c, d in zone_bounds]
    if not zb:
        raise ValueError("zone_bounds must be non-empty")

    def assign(batch: pa.Table) -> pa.Table:
        lon = batch.column("lon").to_numpy()
        lat = batch.column("lat").to_numpy()
        best_d = np.full(len(lon), np.inf)
        best_z = np.full(len(lon), -1, np.int64)
        for z, x0, y0, x1, y1 in zb:
            dx = np.maximum(0.0, np.maximum(x0 - lon, lon - x1))
            dy = np.maximum(0.0, np.maximum(y0 - lat, lat - y1))
            d2 = dx * dx + dy * dy
            better = (d2 < best_d) | ((d2 == best_d) & (z < best_z))
            best_d = np.where(better, d2, best_d)
            best_z = np.where(better, z, best_z)
        return pa.table(
            {
                id_col: batch.column(id_col).cast(pa.int64()),
                "zone_id": pa.array(best_z, pa.int64()),
                "dist2": pa.array(best_d, pa.float64()),
            }
        )

    return points.map_batches(assign, batch_format="pyarrow")


_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_batch(
    batch: pa.Table,
    lon_col: str = "lon",
    lat_col: str = "lat",
    nchars: int = 8,
    out_col: str = "geohash",
) -> pa.Table:
    """Append the classic base32 geohash (``nchars`` characters, 5 bits
    each; lon/lat quantized to 20 bits). Geohash's defining property —
    a parent cell is a string PREFIX of its children — makes multi-
    resolution rollups a plain string-prefix groupby, no re-encode.

    Fully vectorized: 40 shift/mask passes build the per-char 5-bit
    values, one fancy-index maps them through the base32 alphabet, and a
    U1->U{nchars} view joins the characters without a Python loop.
    Bit-identical to synth.geohash_sql (same IEEE quantization ops)."""
    if not 1 <= nchars <= 8:
        raise ValueError("nchars must be in [1, 8] (20+20 quantized bits)")
    lon = batch.column(lon_col).to_numpy()
    lat = batch.column(lat_col).to_numpy()
    mx = np.clip(
        np.floor((lon + 180.0) / 360.0 * 1048576.0), 0, 1048575
    ).astype(np.int64)
    my = np.clip(
        np.floor((lat + 90.0) / 180.0 * 1048576.0), 0, 1048575
    ).astype(np.int64)
    n = len(mx)
    vals = np.zeros((nchars, n), dtype=np.int64)
    for k in range(nchars):
        for b in range(5):
            j = 5 * k + b
            if j % 2 == 0:
                bit = (mx >> (19 - j // 2)) & 1
            else:
                bit = (my >> (19 - (j - 1) // 2)) & 1
            vals[k] += bit << (4 - b)
    lookup = np.array(list(_B32))
    chars = lookup[vals.T].copy()  # (n, nchars), C-contiguous U1
    gh = chars.view(f"<U{nchars}")[:, 0]
    return batch.append_column(out_col, pa.array(gh, pa.string()))


def convex_hull_edges(geo, group_col: str = "grp"):
    """Grouped 2-D convex hulls (ST_ConvexHull / chull parity): one hull
    per group of points, emitted as directed CCW hull EDGES (grp, a_id,
    b_id, x0, y0, x1, y1) — an edge set needs no start-vertex convention,
    so results compare order-free.

    Ray shape: ``groupby(grp).map_groups`` — each group's Andrew monotone
    chain runs locally (hulls have no cross-group dependency); only
    (grp, id, lon, lat) rows shuffle. Groups with < 3 points emit nothing.

    Determinism: geocoded points are affine images of the INTEGER hash
    lattice (id*MULT mod 2^32), where exactly-collinear triples are
    common (ids in one group form an arithmetic progression), so all turn
    tests run in EXACT integer arithmetic on the lattice coordinates
    (Python bigints — products exceed int64); the strict chain drops
    collinear boundary points and the SQL oracle's edge test mirrors that
    with HUGEINT crosses plus the collinear-strictly-between allowance.
    Output lon/lat are the float coordinates of the kept vertices."""
    import pandas as pd

    from .. import synth

    M = synth.HASH_MOD

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        out = {k: [] for k in ("grp", "a_id", "b_id", "x0", "y0", "x1", "y1")}
        g = int(df[group_col].iloc[0]) if len(df) else 0
        ids = df["doc_id"].to_numpy()
        lon = dict(zip(ids.tolist(), df["lon"].tolist()))
        lat = dict(zip(ids.tolist(), df["lat"].tolist()))
        pts = sorted(
            (
                int(i) * synth.LON_MULT % M,
                int(i) * synth.LAT_MULT % M,
                int(i),
            )
            for i in ids
        )
        if len(pts) >= 3:

            def chain(points):
                hull = []
                for p in points:
                    while len(hull) >= 2:
                        ox, oy, _ = hull[-2]
                        axx, ayy, _ = hull[-1]
                        if (axx - ox) * (p[1] - oy) - (ayy - oy) * (p[0] - ox) <= 0:
                            hull.pop()
                        else:
                            break
                    hull.append(p)
                return hull

            lower = chain(pts)
            upper = chain(pts[::-1])
            ring = lower[:-1] + upper[:-1]  # CCW, no repeated endpoint
            for (_, _, aid), (_, _, bid) in zip(ring, ring[1:] + ring[:1]):
                out["grp"].append(g)
                out["a_id"].append(aid)
                out["b_id"].append(bid)
                out["x0"].append(lon[aid])
                out["y0"].append(lat[aid])
                out["x1"].append(lon[bid])
                out["y1"].append(lat[bid])
        res = pd.DataFrame(out)
        res["grp"] = res["grp"].astype("int64")
        res["a_id"] = res["a_id"].astype("int64")
        res["b_id"] = res["b_id"].astype("int64")
        return res

    return geo.groupby(group_col).map_groups(fold, batch_format="pandas")


def hull_stats(geo, group_col: str = "grp"):
    """Per-group convex-hull metrics from the hull EDGE set: vertex count
    and twice the enclosed area (exact shoelace over the integer hash
    lattice — Python bigints, since lattice crosses exceed int64).
    Returns (grp:int64, n_vertices:int64, area2:string) — area2 is the
    exact decimal string of the 2A integer (up to ~2^64, beyond int64)."""
    import pandas as pd

    from .. import synth

    edges = convex_hull_edges(geo, group_col)
    M = synth.HASH_MOD

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = int(df["grp"].iloc[0]) if len(df) else 0
        area2 = 0
        for a, b in zip(df["a_id"].astype(int), df["b_id"].astype(int)):
            ax, ay = a * synth.LON_MULT % M, a * synth.LAT_MULT % M
            bx, by = b * synth.LON_MULT % M, b * synth.LAT_MULT % M
            area2 += ax * by - bx * ay
        return pd.DataFrame(
            {
                "grp": pd.Series([g], dtype="int64"),
                "n_vertices": pd.Series([len(df)], dtype="int64"),
                "area2": pd.Series([str(area2)], dtype="object"),
            }
        )

    return edges.groupby("grp").map_groups(fold, batch_format="pandas")


def simplify_lines(lines, tol: int):
    """Douglas-Peucker polyline simplification (ST_Simplify / ogr2ogr
    -simplify) with EXACT integer geometry: vertices live on an integer
    lattice, so the split decision compares cross^2 > tol^2 * len2 in
    int64 — no float epsilon, bit-deterministic at any parallelism; the
    farthest-vertex argmax ties break to the LOWEST index.

    ``lines`` rows: (line_id:int64, xs:list<int64>, ys:list<int64>).
    Ray shape: plain ``map_batches`` — every polyline simplifies
    independently, zero shuffle. Returns (line_id, seq, x, y) kept
    vertices in original order.

    Degenerate closed segments (endpoints equal) fall back to point
    distance from the anchor. Endpoints are always kept.
    """
    import pandas as pd
    import pyarrow as pa

    t2 = int(tol) * int(tol)

    def dp(xs, ys):
        n = len(xs)
        keep = [False] * n
        keep[0] = keep[n - 1] = True
        stack = [(0, n - 1)]
        while stack:
            lo, hi = stack.pop()
            if hi - lo < 2:
                continue
            ax, ay, bx, by = xs[lo], ys[lo], xs[hi], ys[hi]
            dx, dy = bx - ax, by - ay
            len2 = dx * dx + dy * dy
            best, best_key = -1, 0
            for j in range(lo + 1, hi):
                px, py = xs[j] - ax, ys[j] - ay
                if len2 == 0:
                    key = (px * px + py * py) * t2  # vs t2 * t2 below
                    bound = t2 * t2
                else:
                    cr = dx * py - dy * px
                    key = cr * cr
                    bound = t2 * len2
                # strict > keeps the FIRST (lowest-index) max on ties
                if key > bound and key > best_key:
                    best, best_key = j, key
            if best >= 0:
                keep[best] = True
                stack.append((lo, best))
                stack.append((best, hi))
        return keep

    def per_batch(batch: pa.Table) -> pa.Table:
        ids = batch.column("line_id").to_numpy()
        xs_col = batch.column("xs")
        ys_col = batch.column("ys")
        out = {"line_id": [], "seq": [], "x": [], "y": []}
        for i in range(batch.num_rows):
            xs = [int(v) for v in xs_col[i].values.to_pylist()]
            ys = [int(v) for v in ys_col[i].values.to_pylist()]
            keep = dp(xs, ys)
            s = 0
            for j, k in enumerate(keep):
                if k:
                    out["line_id"].append(int(ids[i]))
                    out["seq"].append(s)
                    out["x"].append(xs[j])
                    out["y"].append(ys[j])
                    s += 1
        return pa.table(
            {
                "line_id": pa.array(out["line_id"], pa.int64()),
                "seq": pa.array(out["seq"], pa.int64()),
                "x": pa.array(out["x"], pa.int64()),
                "y": pa.array(out["y"], pa.int64()),
            }
        )

    return lines.map_batches(per_batch, batch_format="pyarrow")
