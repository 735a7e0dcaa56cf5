"""Similarity search over an embedding column: brute-force cosine top-k
(baseline) and an LSH-bucketed variant (scale path).

Brute force is the canonical broadcast pattern: the query matrix is put in
the object store ONCE (``ray.put``), every map task computes a numpy matmul
against its batch and emits only per-batch top-k candidate rows; a tiny
``groupby(query_id)`` selects the global top-k. Shuffle volume:
O(num_queries * k * num_batches) rows, never the embeddings themselves.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray


def _to_matrix(col) -> np.ndarray:
    arr = col.combine_chunks() if hasattr(col, "combine_chunks") else col
    flat = np.asarray(arr.values, dtype=np.float64)
    n = len(arr)
    return flat.reshape(n, -1) if n else flat.reshape(0, 0)


class BruteForceTopK:
    """Actor stage: batch embeddings x broadcast queries -> candidate rows."""

    def __init__(self, queries_ref, k: int, id_col: str, vec_col: str):
        q = ray.get(queries_ref) if not isinstance(queries_ref, tuple) else queries_ref
        self.query_ids, qmat = q
        norms = np.linalg.norm(qmat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        self.qmat = (qmat / norms).T  # (dim, Q)
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_numpy()
        mat = _to_matrix(batch.column(self.vec_col))
        if mat.size == 0:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "neighbor_id": pa.array([], pa.int64()),
                    "sim": pa.array([], pa.float64()),
                }
            )
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        sims = (mat / norms) @ self.qmat  # (B, Q)
        k = min(self.k, sims.shape[0])
        # one argpartition across ALL query columns (no per-candidate
        # Python loop); the global finalize re-sorts, so only the selected
        # SET matters and any within-column order is fine
        if k < sims.shape[0]:
            top = np.argpartition(-sims, k - 1, axis=0)[:k]  # (k, Q)
        else:
            top = np.broadcast_to(
                np.arange(sims.shape[0])[:, None], (k, sims.shape[1])
            )
        qids = np.broadcast_to(
            np.asarray(self.query_ids, dtype=np.int64), (k, sims.shape[1])
        ).ravel()
        nbr = np.asarray(ids, dtype=np.int64)[top].ravel()
        sim = np.take_along_axis(sims, top, axis=0).ravel()
        return pa.table(
            {
                "query_id": pa.array(qids, pa.int64()),
                "neighbor_id": pa.array(nbr, pa.int64()),
                "sim": pa.array(sim, pa.float64()),
            }
        )


def knn_cosine(
    ds,
    query_ids: np.ndarray,
    query_matrix: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
):
    """Global cosine top-k of each query vector against the Dataset.

    Returns a Dataset of (query_id, neighbor_id, rank, sim) with rank 1..k,
    ordered deterministically by (-sim, neighbor_id) within each query.
    """
    from ..util import cached_stage

    queries_ref = ray.put(
        (np.asarray(query_ids, dtype=np.int64), np.asarray(query_matrix, dtype=np.float64))
    )
    cand = ds.map_batches(
        cached_stage(
            BruteForceTopK, queries_ref, k + (1 if exclude_self else 0), id_col, vec_col
        ),
        batch_format="pyarrow",
        batch_size=8192,
    )

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        qid = int(g["query_id"].iloc[0])
        if exclude_self:
            g = g[g["neighbor_id"] != qid]
        g = g.sort_values(["sim", "neighbor_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", "neighbor_id", "rank", "sim"]]

    return cand.groupby("query_id").map_groups(final_topk, batch_format="pandas")


def _threshold_pair_indices(
    A: np.ndarray, B: np.ndarray, threshold: float, chunk: int
):
    """Yield (row_idx, col_idx) of A@B.T >= threshold, computed over
    chunk x chunk panels so peak memory is O(chunk^2) regardless of group
    size — never the full cross-similarity matrix."""
    for r0 in range(0, A.shape[0], chunk):
        Ar = A[r0 : r0 + chunk]
        for c0 in range(0, B.shape[0], chunk):
            sims = Ar @ B[c0 : c0 + chunk].T
            rows, cols = np.nonzero(sims >= threshold)
            if len(rows):
                yield rows + r0, cols + c0


def embedding_dup_pairs(
    ds,
    threshold: float = 0.45,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_blocks: int | None = None,
    matmul_chunk: int = 2048,
):
    """Embedding-cosine near-duplicate pairs: all (a, b), a < b, with cosine
    similarity >= threshold. EXACT (no LSH recall loss), fully distributed.

    Scale shape: a block-pair join. Vectors hash into ``num_blocks`` blocks;
    each vector is replicated to the ``num_blocks`` block-pair groups its
    block participates in, and each (i, j) group computes its cross matmul
    independently — total shuffle O(N * num_blocks), never a driver
    materialization, never the n^2 similarity matrix (only above-threshold
    pairs leave a group). ``num_blocks`` defaults to ~sqrt(2 * cluster
    cores) so the block-pair group count tracks the core count; the
    in-group matmul runs over ``matmul_chunk``-square panels, bounding
    per-task memory at O(chunk^2) however large a group grows. The
    approximate O(N) alternative at extreme scale is hyperplane-LSH
    bucketing (knn_cosine_lsh)."""
    if num_blocks is None:
        import math

        ncpu = int(ray.cluster_resources().get("CPU", 8))
        # nb*(nb+1)/2 block-pair groups ~= core count
        num_blocks = max(4, int(math.ceil(math.sqrt(2.0 * ncpu))))
    nb = int(num_blocks)
    chunk = max(1, int(matmul_chunk))

    def expand(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy().astype(np.int64)
        n = len(ids)
        if n == 0:
            return pa.table(
                {
                    "pairkey": pa.array([], pa.int64()),
                    "block": pa.array([], pa.int64()),
                    id_col: pa.array([], pa.int64()),
                    vec_col: batch.column(vec_col),
                }
            )
        blk = ids % nb
        # each vector joins nb block-pair groups: (min(b,o), max(b,o)) ∀ o
        keys = np.empty((n, nb), dtype=np.int64)
        for o in range(nb):
            lo = np.minimum(blk, o)
            hi = np.maximum(blk, o)
            keys[:, o] = lo * nb + hi
        idx = np.repeat(np.arange(n, dtype=np.int64), nb)
        return pa.table(
            {
                "pairkey": pa.array(keys.ravel(), pa.int64()),
                "block": pa.array(np.repeat(blk, nb), pa.int64()),
                id_col: pa.array(np.repeat(ids, nb), pa.int64()),
                vec_col: batch.column(vec_col).combine_chunks().take(
                    pa.array(idx, pa.int64())
                ),
            }
        )

    def group_pairs(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "vec_a": pd.Series([], dtype=np.int64),
                "vec_b": pd.Series([], dtype=np.int64),
            }
        )
        key = int(g["pairkey"].iloc[0])
        bi, bj = key // nb, key % nb
        # the same (id, block) row lands once per group by construction
        ids = g[id_col].to_numpy().astype(np.int64)
        blk = g["block"].to_numpy()
        mat = np.stack(g[vec_col].to_numpy()).astype(np.float64)
        nm = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        if bi == bj:
            hits = list(_threshold_pair_indices(nm, nm, threshold, chunk))
            if not hits:
                return empty
            rows = np.concatenate([h[0] for h in hits])
            cols = np.concatenate([h[1] for h in hits])
            a, b = ids[rows], ids[cols]
        else:
            ma, mb = blk == bi, blk == bj
            if not ma.any() or not mb.any():
                return empty
            ia, ib = ids[ma], ids[mb]
            hits = list(_threshold_pair_indices(nm[ma], nm[mb], threshold, chunk))
            if not hits:
                return empty
            rows = np.concatenate([h[0] for h in hits])
            cols = np.concatenate([h[1] for h in hits])
            a, b = ia[rows], ib[cols]
        # canonical unordered orientation; a pair lives in exactly one group
        if bi == bj:
            keep = a < b  # diagonal sims matrix yields both orientations
            a, b = a[keep], b[keep]
        else:
            a, b = np.minimum(a, b), np.maximum(a, b)
        if len(a) == 0:
            return empty
        order = np.lexsort((b, a))
        return pd.DataFrame(
            {
                "vec_a": pd.Series(a[order], dtype=np.int64),
                "vec_b": pd.Series(b[order], dtype=np.int64),
            }
        )

    expanded = ds.map_batches(expand, batch_format="pyarrow")
    return expanded.groupby("pairkey").map_groups(
        group_pairs, batch_format="pandas"
    )


def _scan_emit(
    ids: np.ndarray,
    nm: np.ndarray,
    buckets: np.ndarray,
    w: dict,
    qn: np.ndarray,
    qix: dict,
    k: int,
) -> pa.Table:
    """Shared LSH/IVF bucket-scan kernel, vectorized: per probed bucket,
    one matmul; per query, a deterministic (-sim, neighbor_id) top-k cut
    (identical to the finalize ordering, so capping per batch never changes
    the global result — the same argument as BruteForceTopK). No
    per-candidate Python appends."""
    parts_q: list[np.ndarray] = []
    parts_n: list[np.ndarray] = []
    parts_s: list[np.ndarray] = []
    for b, qids in w.items():
        rows = np.nonzero(buckets == b)[0]
        if len(rows) == 0:
            continue
        sims = nm[rows] @ qn[[qix[q] for q in qids]].T  # (R, J)
        rid = ids[rows].astype(np.int64)
        kk = min(k, len(rows))
        for j, q in enumerate(qids):
            col = sims[:, j]
            if kk < len(rows):
                ord_ = np.lexsort((rid, -col))[:kk]
            else:
                ord_ = np.arange(len(rows))
            parts_q.append(np.full(len(ord_), int(q), np.int64))
            parts_n.append(rid[ord_])
            parts_s.append(col[ord_])
    if not parts_q:
        return pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "neighbor_id": pa.array([], pa.int64()),
                "sim": pa.array([], pa.float64()),
            }
        )
    return pa.table(
        {
            "query_id": pa.array(np.concatenate(parts_q), pa.int64()),
            "neighbor_id": pa.array(np.concatenate(parts_n), pa.int64()),
            "sim": pa.array(np.concatenate(parts_s), pa.float64()),
        }
    )


# ---------------- IVF: bucket-PARTITIONED ANN (storage-pruning path) -------


def build_ivf_index(
    ds,
    out_dir: str,
    num_planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> None:
    """Write an IVF-style index: embeddings re-written as parquet
    PARTITIONED BY hyperplane-LSH bucket, plus a sidecar with the planes.

    This is the 100-TB shape the in-memory LSH scan (knn_cosine_lsh) only
    approximates: at query time only the matching bucket PARTITIONS are
    read, so pruning happens at storage I/O, not per-batch matmuls."""
    import json
    import os

    import numpy as np

    # dim from the first row (cheap metadata probe)
    first = ds.take(1)[0]
    dim = len(first[vec_col])
    lsh = RandomHyperplaneLSH(dim, num_planes, seed)
    planes_ref = ray.put(lsh.planes)

    def assign(batch: pa.Table) -> pa.Table:
        planes = ray.get(planes_ref)
        mat = _to_matrix(batch.column(vec_col))
        signs = (mat @ planes) > 0
        buckets = (signs * (1 << np.arange(signs.shape[1]))).sum(axis=1)
        out = batch.append_column(
            "bucket", pa.array(buckets.astype(np.int64), pa.int64())
        )
        # partition_cols moves 'bucket' into the path; keep a data copy so
        # per-row bucket membership survives into query-time batches
        return out.append_column(
            "bucket_id", pa.array(buckets.astype(np.int64), pa.int64())
        )

    ds.map_batches(assign, batch_format="pyarrow").write_parquet(
        out_dir, partition_cols=["bucket"]
    )
    with open(os.path.join(out_dir, "_ivf_meta.json"), "w") as f:
        json.dump(
            {"num_planes": num_planes, "seed": seed, "dim": dim,
             "planes": lsh.planes.tolist()},
            f,
        )


def knn_cosine_ivf(
    index_dir: str,
    query_ids: np.ndarray,
    query_matrix: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_hamming: int = 0,
):
    """Approximate top-k over a bucket-partitioned IVF index: reads ONLY the
    partitions whose bucket matches a query (storage-level pruning), then
    exact cosine ranking within them. Same output contract as
    knn_cosine_lsh with the same planes; ``probe_hamming`` is multi-probe
    like knn_cosine_lsh (the extra probed buckets' partitions are read too
    — the pruning stays at the file-list level)."""
    import json
    import os

    import ray.data

    with open(os.path.join(index_dir, "_ivf_meta.json")) as f:
        meta = json.load(f)
    planes = np.asarray(meta["planes"], dtype=np.float64)
    num_planes = planes.shape[1]
    qm = np.asarray(query_matrix, dtype=np.float64)
    signs = (qm @ planes) > 0
    qb = (signs * (1 << np.arange(signs.shape[1]))).sum(axis=1).astype(np.int64)

    wanted = sorted({
        pb for b in qb for pb in hamming_probes(int(b), num_planes, probe_hamming)
    })

    # storage-level pruning by construction: only the matching bucket
    # partitions' files are even listed
    import glob as _glob

    files: list[str] = []
    for b in wanted:
        files.extend(
            sorted(_glob.glob(os.path.join(index_dir, f"bucket={b}", "*.parquet")))
        )
    if not files:
        return ray.data.from_arrow(
            pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "neighbor_id": pa.array([], pa.int64()),
                    "rank": pa.array([], pa.int64()),
                    "sim": pa.array([], pa.float64()),
                }
            )
        )
    emb = ray.data.read_parquet(files)
    qnorm = qm / np.maximum(np.linalg.norm(qm, axis=1, keepdims=True), 1e-12)
    qidx = {int(q): i for i, q in enumerate(query_ids)}
    by_bucket: dict[int, list[int]] = {}
    for q, b in zip(query_ids, qb):
        for pb in hamming_probes(int(b), num_planes, probe_hamming):
            by_bucket.setdefault(pb, []).append(int(q))
    wanted_ref = ray.put((by_bucket, qnorm, qidx))

    def scan(batch: pa.Table) -> pa.Table:
        w, qn, qix = ray.get(wanted_ref)
        ids = batch.column(id_col).to_numpy()
        buckets = batch.column("bucket_id").to_numpy()
        mat = _to_matrix(batch.column(vec_col))
        if mat.size == 0:
            return _scan_emit(ids, mat, buckets, {}, qn, qix, k + 1)
        nm = mat / np.maximum(
            np.linalg.norm(mat, axis=1, keepdims=True), 1e-12
        )
        # k+1 candidates per (query, batch): finalize drops the self match
        return _scan_emit(ids, nm, buckets, w, qn, qix, k + 1)

    cand = emb.map_batches(scan, batch_format="pyarrow")

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        qid = int(g["query_id"].iloc[0])
        g = g[g["neighbor_id"] != qid]
        g = g.sort_values(["sim", "neighbor_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", "neighbor_id", "rank", "sim"]]

    return cand.groupby("query_id").map_groups(final_topk, batch_format="pandas")


# ---------------- LSH-bucketed ANN (scale path) ----------------


class RandomHyperplaneLSH:
    """Sign-random-projection bucketing: 2^num_planes buckets. Queries are
    assigned the same buckets; search only touches matching buckets, turning
    the full scan into a partition-pruned scan (the IVF-style scale path)."""

    def __init__(self, dim: int, num_planes: int = 8, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, num_planes))

    def bucket(self, mat: np.ndarray) -> np.ndarray:
        signs = (mat @ self.planes) > 0
        return (signs * (1 << np.arange(signs.shape[1]))).sum(axis=1).astype(np.int64)


def hamming_probes(b: int, num_planes: int, h: int) -> list[int]:
    """The bucket ``b`` plus every bucket within Hamming distance ``h`` of
    it (multi-probe LSH, Lv et al. VLDB'07). Probes are DISTINCT by
    construction (single and pairwise bit flips never collide), shared by
    the in-memory scan, the IVF path, and the oracle re-derivation."""
    if h > 2:
        raise ValueError("probe_hamming > 2 not supported")
    out = [b]
    if h >= 1:
        out += [b ^ (1 << i) for i in range(num_planes)]
    if h >= 2:
        out += [
            b ^ (1 << i) ^ (1 << j)
            for i in range(num_planes)
            for j in range(i + 1, num_planes)
        ]
    return out


def knn_cosine_lsh(
    ds,
    query_ids: np.ndarray,
    query_matrix: np.ndarray,
    k: int = 10,
    num_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_hamming: int = 0,
):
    """Approximate top-k: only vectors in a query's hyperplane-LSH bucket are
    scanned. Recall < 1.0 by design; same output schema as knn_cosine.

    ``probe_hamming`` enables multi-probe LSH (Lv et al., VLDB'07): each
    query also scans buckets within the given Hamming distance of its own
    — flipping h of ``num_planes`` sign bits. probe_hamming=1 scans
    (1 + num_planes) of the 2^num_planes buckets and typically multiplies
    recall severalfold for a proportional scan-cost increase; candidate
    generation stays bucket-pruned, so the 100-TB path (partition by
    bucket, prune at the file list) is unchanged."""
    dim = query_matrix.shape[1]
    lsh = RandomHyperplaneLSH(dim, num_planes)
    qb = lsh.bucket(np.asarray(query_matrix, dtype=np.float64))

    wanted = {}
    for qid, b in zip(query_ids, qb):
        for pb in hamming_probes(int(b), num_planes, probe_hamming):
            wanted.setdefault(pb, []).append(int(qid))
    qnorm = query_matrix / np.maximum(
        np.linalg.norm(query_matrix, axis=1, keepdims=True), 1e-12
    )
    qidx = {int(q): i for i, q in enumerate(query_ids)}
    wanted_ref = ray.put((wanted, qnorm, qidx, lsh.planes))

    def scan(batch: pa.Table) -> pa.Table:
        w, qn, qix, planes = ray.get(wanted_ref)
        ids = batch.column(id_col).to_numpy()
        mat = _to_matrix(batch.column(vec_col))
        if mat.size == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        signs = (mat @ planes) > 0
        buckets = (signs * (1 << np.arange(signs.shape[1]))).sum(axis=1).astype(np.int64)
        norms = np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        nm = mat / norms
        # k+1 candidates per (query, batch): finalize drops the self match
        return _scan_emit(ids, nm, buckets, w, qn, qix, k + 1)

    cand = ds.map_batches(scan, batch_format="pyarrow")

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        qid = int(g["query_id"].iloc[0])
        g = g[g["neighbor_id"] != qid]
        g = g.sort_values(["sim", "neighbor_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", "neighbor_id", "rank", "sim"]]

    return cand.groupby("query_id").map_groups(final_topk, batch_format="pandas")


def semdedup(
    ds,
    k_clusters: int = 8,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster the embedding
    space, then drop semantic duplicates WITHIN each cluster — pairwise
    cosine is only ever computed inside a cluster, so the all-pairs cost
    falls from O(N^2) to O(N^2 / k) and each cluster's work is one local
    matmul. Keep rule: a vector is dropped iff some LOWER-id vector in its
    cluster has cosine >= threshold (deterministic stand-in for the paper's
    keep-farthest-from-centroid; same dedup set size).

    Clustering here is deterministic assignment to the ``k_clusters``
    lowest-id vectors as centroids (argmax cosine, ties to the lowest
    centroid id) — the paper's k-means is interchangeable and at 100 TB you
    would run k-means|| offline and broadcast the centroids the same way.

    Distributed shape: centroids broadcast once via ``ray.put``; assignment
    is a per-batch matmul in ``map_batches``; the ONLY shuffle moves each
    embedding once, keyed by cluster; per-cluster dedup is one vectorized
    Gram matmul in ``map_groups`` (k groups, so group count — not document
    count — bounds the Python overhead). Cluster size ~ N/k bounds the local
    matmul; scale k with N. Output: (vec_id, cluster_id, keep).
    """
    cdf = (
        ds.filter(expr=f"{id_col} < {k_clusters}")
        .select_columns([id_col, vec_col])
        .to_pandas()
        .sort_values(id_col)
    )
    cmat = np.stack(cdf[vec_col].to_numpy()).astype(np.float64)
    cnorm = np.linalg.norm(cmat, axis=1, keepdims=True)
    cnorm[cnorm == 0] = 1.0
    cref = ray.put((cmat / cnorm).T)  # (dim, k)

    def assign(batch: pa.Table) -> pa.Table:
        cT = ray.get(cref)
        ids = batch.column(id_col).to_numpy().astype(np.int64)
        mat = _to_matrix(batch.column(vec_col))
        if mat.size == 0:
            cl = np.empty(0, dtype=np.int64)
        else:
            norms = np.linalg.norm(mat, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            # argmax takes the FIRST max -> ties resolve to the lowest
            # centroid id, matching the oracle's ORDER BY sim DESC, cid ASC
            cl = np.argmax((mat / norms) @ cT, axis=1).astype(np.int64)
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "cluster_id": pa.array(cl, pa.int64()),
                vec_col: batch.column(vec_col),
            }
        )

    def within(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col)
        M = np.stack(g[vec_col].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(M, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        Mn = M / norms
        gram = Mn @ Mn.T
        dup = np.tril(gram >= threshold, k=-1).any(axis=1)
        return pd.DataFrame(
            {
                id_col: g[id_col].to_numpy(np.int64),
                "cluster_id": g["cluster_id"].to_numpy(np.int64),
                "keep": ~dup,
            }
        )

    return (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby("cluster_id")
        .map_groups(within, batch_format="pandas")
    )


# ---------------- product quantization (PQ) ----------------


def train_pq(
    ds,
    m: int = 8,
    ks: int = 16,
    sample: int = 2048,
    iters: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
) -> np.ndarray:
    """Train PQ sub-quantizer codebooks (Jegou et al. 2011, "Product
    Quantization for Nearest Neighbor Search"): split the (normalized)
    vector into ``m`` contiguous subspaces and run a small deterministic
    Lloyd k-means with ``ks`` centroids in each.

    Deterministic by construction: the training set is the ``sample``
    lowest-id vectors (a driver-side take of a bounded, sorted sample —
    at 100 TB you sample by hash(id) the same way and the codebook is
    still a broadcast-sized artifact), init is a seeded permutation of
    the sample, iteration count is fixed, and empty clusters re-seed from
    the sample in id order. Returns float64 (m, ks, dim//m).
    """
    rows = ds.sort(id_col).limit(int(sample)).take_all()
    mat = np.asarray([r[vec_col] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    mat = mat / norms
    n, dim = mat.shape
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    ks_eff = min(int(ks), n)
    rng = np.random.RandomState(seed)
    books = np.empty((m, ks_eff, dsub), np.float64)
    for i in range(m):
        X = mat[:, i * dsub:(i + 1) * dsub]
        C = X[rng.permutation(n)[:ks_eff]].copy()
        for _ in range(int(iters)):
            d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            a = d2.argmin(axis=1)
            for j in range(ks_eff):
                sel = a == j
                if sel.any():
                    C[j] = X[sel].mean(axis=0)
                else:
                    C[j] = X[j % n]  # deterministic re-seed
        books[i] = C
    return books


class PQEncode:
    """Actor stage: normalized vectors -> m uint8 codes (argmin centroid
    per subspace). Stored as an m-byte binary column: the 100-TB memory
    story — dim*8 bytes/vector become m bytes (64x for dim=64, m=8)."""

    def __init__(self, books_ref, id_col: str, vec_col: str):
        self.books = ray.get(books_ref) if not isinstance(
            books_ref, np.ndarray) else books_ref
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_numpy()
        mat = _to_matrix(batch.column(self.vec_col))
        m, ks, dsub = self.books.shape
        if mat.size == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "code": pa.array([], pa.binary())})
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        mat = mat / norms
        codes = np.empty((mat.shape[0], m), np.uint8)
        for i in range(m):
            X = mat[:, i * dsub:(i + 1) * dsub]
            C = self.books[i]
            # ||x-c||^2 argmin via the expanded form: one matmul per subspace
            d2 = (X * X).sum(1)[:, None] - 2.0 * X @ C.T + (C * C).sum(1)[None]
            codes[:, i] = d2.argmin(axis=1)
        return pa.table({
            "vec_id": pa.array(ids.astype(np.int64), pa.int64()),
            "code": pa.array([c.tobytes() for c in codes], pa.binary()),
        })


def pq_encode(ds, books: np.ndarray, id_col="vec_id", vec_col="embedding"):
    """Dataset of (vec_id, code) — the compressed corpus representation."""
    from ..util import cached_stage

    books_ref = ray.put(np.ascontiguousarray(books))
    return ds.map_batches(
        cached_stage(PQEncode, books_ref, id_col, vec_col),
        batch_format="pyarrow", batch_size=8192,
    )


class PQScanTopK:
    """Actor stage: ADC (asymmetric distance computation) scan over code
    batches. Per query a (m, ks) lookup table of query-subvector x
    centroid dot products is built ONCE in __init__; scoring a vector is
    m table lookups + adds — no float vector is ever touched."""

    def __init__(self, books_ref, queries_ref, k: int):
        books = ray.get(books_ref) if not isinstance(
            books_ref, np.ndarray) else books_ref
        q = ray.get(queries_ref) if not isinstance(
            queries_ref, tuple) else queries_ref
        self.query_ids, qmat = q
        qmat = np.asarray(qmat, np.float64)
        norms = np.linalg.norm(qmat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        qmat = qmat / norms
        m, ks, dsub = books.shape
        Q = qmat.shape[0]
        # lut[q, i, j] = <q_sub_i, c_ij>: approx cosine = sum_i lut[q,i,code_i]
        self.lut = np.einsum(
            "qid,ikd->qik",
            qmat.reshape(Q, m, dsub), books,
        )
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").to_numpy()
        n = len(ids)
        if n == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "adc": pa.array([], pa.float64())})
        m = self.lut.shape[1]
        codes = np.frombuffer(
            b"".join(batch.column("code").to_pylist()), np.uint8
        ).reshape(n, m)
        Q = self.lut.shape[0]
        scores = np.zeros((Q, n), np.float64)
        for i in range(m):
            scores += self.lut[:, i, codes[:, i]]
        k = min(self.k, n)
        if k < n:
            top = np.argpartition(-scores, k - 1, axis=1)[:, :k]
        else:
            top = np.broadcast_to(np.arange(n)[None, :], (Q, n))
        qids = np.broadcast_to(
            np.asarray(self.query_ids, np.int64)[:, None], top.shape
        ).ravel()
        return pa.table({
            "query_id": pa.array(qids, pa.int64()),
            "neighbor_id": pa.array(
                ids.astype(np.int64)[top].ravel(), pa.int64()),
            "adc": pa.array(
                np.take_along_axis(scores, top, axis=1).ravel(),
                pa.float64()),
        })


def knn_cosine_pq(
    ds,
    query_ids: np.ndarray,
    query_matrix: np.ndarray,
    k: int = 10,
    m: int = 8,
    ks: int = 16,
    refine: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
    books: np.ndarray | None = None,
    num_partitions: int = 64,
):
    """Approximate cosine top-k via product quantization with exact
    re-rank — the realistic 100-TB ANN memory story next to IVF
    (build_ivf_index) and hyperplane LSH (knn_cosine_lsh):

    1. train: deterministic per-subspace k-means on a bounded sample
       (driver-side, codebook is a broadcast artifact);
    2. encode: corpus -> m uint8 codes/vector (dim*8 -> m bytes);
    3. ADC scan: per-batch table-lookup scoring over CODES ONLY, partial
       top-(refine*k) per batch, global top-(refine*k) per query;
    4. exact re-rank: ONLY the refine*k surviving candidates' float
       vectors move (a union-groupby semi-join keyed by vec_id — the
       repo's standard hash-join shape), exact cosine, final top-k.

    With refine*k >= corpus size this is EXACTLY brute-force top-k
    (tested); smaller refine trades recall for scan cost. Returns
    (query_id, neighbor_id, rank, sim) like knn_cosine.
    """
    import pandas as pd

    from ..util import cached_stage

    if books is None:
        books = train_pq(ds, m=m, ks=ks, id_col=id_col, vec_col=vec_col)
    books = np.ascontiguousarray(books)
    books_ref = ray.put(books)
    qids = np.asarray(query_ids, np.int64)
    qmat = np.asarray(query_matrix, np.float64)
    queries_ref = ray.put((qids, qmat))
    codes = pq_encode(ds, books, id_col=id_col, vec_col=vec_col)
    nkeep = int(refine) * (k + (1 if exclude_self else 0))
    cand = codes.map_batches(
        cached_stage(PQScanTopK, books_ref, queries_ref, nkeep),
        batch_format="pyarrow", batch_size=8192,
    )

    def per_query_keep(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["adc", "neighbor_id"],
                          ascending=[False, True]).head(nkeep)
        return g[["query_id", "neighbor_id"]].reset_index(drop=True)

    kept = cand.groupby("query_id").map_groups(
        per_query_keep, batch_format="pandas")

    # exact re-rank: semi-join candidates to their float vectors without
    # moving the corpus — union keyed by hash(vec_id) % num_partitions
    njoin = int(num_partitions)

    def tag_marks(batch: pa.Table) -> pa.Table:
        nb = batch.column("neighbor_id").to_numpy()
        return pa.table({
            "jkey": pa.array((nb % njoin).astype(np.int64)),
            "tag": pa.array(np.ones(len(nb), np.int64)),
            "vec_id": pa.array(nb.astype(np.int64)),
            "query_id": batch.column("query_id"),
            "vec": pa.array([[]] * len(nb),
                            pa.list_(pa.float64())),
        })

    def tag_vecs(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy()
        mat = _to_matrix(batch.column(vec_col)).astype(np.float64)
        return pa.table({
            "jkey": pa.array((ids % njoin).astype(np.int64)),
            "tag": pa.array(np.zeros(len(ids), np.int64)),
            "vec_id": pa.array(ids.astype(np.int64)),
            "query_id": pa.array(np.full(len(ids), -1, np.int64)),
            "vec": pa.array(list(mat), pa.list_(pa.float64())),
        })

    norms = np.linalg.norm(qmat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    qn_ref = ray.put((qids, (qmat / norms)))

    def rerank(g: pd.DataFrame) -> pd.DataFrame:
        have = g[g["tag"] == 0]
        vecs = {int(v): np.asarray(e, np.float64)
                for v, e in zip(have["vec_id"], have["vec"])}
        marks = g[g["tag"] == 1]
        if not len(marks):
            return pd.DataFrame({"query_id": pd.Series([], dtype=np.int64),
                                 "neighbor_id": pd.Series([], dtype=np.int64),
                                 "sim": pd.Series([], dtype=np.float64)})
        q_ids, qn = ray.get(qn_ref)
        qrow = {int(qid): qn[i] for i, qid in enumerate(q_ids)}
        out_q, out_n, out_s = [], [], []
        for qid, nb in zip(marks["query_id"], marks["vec_id"]):
            v = vecs.get(int(nb))
            if v is None:
                continue
            nv = np.linalg.norm(v) or 1.0
            out_q.append(int(qid))
            out_n.append(int(nb))
            out_s.append(float(qrow[int(qid)] @ (v / nv)))
        return pd.DataFrame({"query_id": np.array(out_q, np.int64),
                             "neighbor_id": np.array(out_n, np.int64),
                             "sim": np.array(out_s, np.float64)})

    scored = (
        kept.map_batches(tag_marks, batch_format="pyarrow")
        .union(ds.map_batches(tag_vecs, batch_format="pyarrow"))
        .groupby("jkey")
        .map_groups(rerank, batch_format="pandas")
    )

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        qid = int(g["query_id"].iloc[0])
        if exclude_self:
            g = g[g["neighbor_id"] != qid]
        g = g.sort_values(["sim", "neighbor_id"],
                          ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", "neighbor_id", "rank", "sim"]]

    return scored.groupby("query_id").map_groups(
        final_topk, batch_format="pandas")
