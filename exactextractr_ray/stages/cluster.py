"""Distributed k-means over an embedding column, in FIXED-POINT integer
arithmetic so every iteration is bit-reproducible and SQL-oracle-checkable
(the same trick as stages/graph.py pagerank).

Embeddings quantize once to int64 at 2^20 ulps (``floor(x * 2^20 + 0.5)``
— floor(+0.5) rather than round() because numpy rounds half-to-even while
SQL ROUND rounds half-away); squared L2 distances, cluster argmin
(ties -> smallest cluster id) and centroid updates (elementwise floor
division) are then exact integer math — independent of summation order,
partitioning and parallelism.

Scale shape:

* the quantized (vec_id, q) projection is checkpointed ONCE and re-read
  per iteration (the cached-edges pattern; at petabyte scale this would be
  a partitioned parquet checkpoint instead of an object-store one);
* per iteration the ONLY broadcast is the k x d int64 centroid matrix
  (ray.put, read per batch), and the only shuffle is k partial rows per
  block -> a k-group combine; vectors never move;
* assignment is one numpy matmul-shaped pass per batch
  (|q - c|^2 = q.q - 2 q.c + c.c, computed in exact int64).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

_SCALE = 1 << 20


def _quantize(x: np.ndarray) -> np.ndarray:
    return np.floor(x.astype(np.float64) * _SCALE + 0.5).astype(np.int64)


def kmeans_fixed(
    ds,
    k: int = 8,
    iters: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Lloyd's k-means, ``iters`` update rounds + one final assignment.

    Initial centroids are the ``k`` smallest-``id_col`` vectors (cluster
    ids 0..k-1 in id order — fully deterministic, no RNG). Empty clusters
    keep their previous centroid. Returns one row per vector:
    (vec_id, cluster_id, dist_q) where dist_q is the exact integer squared
    distance to the final centroid.
    """
    if k < 1:
        raise ValueError("kmeans_fixed: k must be >= 1")
    if iters < 0:
        raise ValueError("kmeans_fixed: iters must be >= 0")

    def project(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_numpy().astype(np.int64)
        if len(ids) == 0:
            return pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "q": pa.array([], pa.list_(pa.int64())),
                }
            )
        emb = np.stack(b.column(vec_col).to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "q": pa.array(list(_quantize(emb)), pa.list_(pa.int64())),
            }
        )

    q = ds.map_batches(project, batch_format="pyarrow").materialize()

    # ---- initial centroids: k smallest vec_ids (per-batch partial top-k,
    # single tiny finalize — only k rows per block reach the driver)
    def min_k(b: pa.Table) -> pa.Table:
        ids = b.column("vec_id").to_numpy()
        keep = np.argsort(ids, kind="stable")[:k]
        return b.take(keep).append_column(
            "g", pa.array(np.zeros(len(keep), np.int64), pa.int64())
        )

    seed = (
        q.map_batches(min_k, batch_format="pyarrow")
        .groupby("g")
        .map_groups(
            lambda g: g.sort_values("vec_id").head(k).reset_index(drop=True),
            batch_format="pandas",
        )
        .to_pandas()
    )
    if len(seed) < k:
        raise ValueError(
            f"kmeans_fixed: k={k} but only {len(seed)} vectors exist"
        )
    cent = np.stack(seed.sort_values("vec_id")["q"].to_numpy()).astype(
        np.int64
    )  # (k, d)

    def assign(qm: np.ndarray, c: np.ndarray):
        # exact int64: |q-c|^2 = q.q - 2 q.c + c.c per (row, cluster)
        d2 = (
            (qm * qm).sum(axis=1, dtype=np.int64)[:, None]
            - 2 * (qm @ c.T)
            + (c * c).sum(axis=1, dtype=np.int64)[None, :]
        )
        cid = np.argmin(d2, axis=1)  # first min -> smallest cluster id
        return cid.astype(np.int64), d2[np.arange(len(cid)), cid]

    for _ in range(iters):
        c_ref = ray.put(cent)

        def partial(b: pa.Table) -> pa.Table:
            c = ray.get(c_ref)
            if b.num_rows == 0:
                return pa.table(
                    {
                        "cid": pa.array([], pa.int64()),
                        "s": pa.array([], pa.list_(pa.int64())),
                        "n": pa.array([], pa.int64()),
                    }
                )
            qm = np.stack(b.column("q").to_numpy(zero_copy_only=False))
            cid, _ = assign(qm, c)
            sums = np.zeros_like(c)
            np.add.at(sums, cid, qm)
            cnt = np.bincount(cid, minlength=len(c)).astype(np.int64)
            return pa.table(
                {
                    "cid": pa.array(np.arange(len(c)), pa.int64()),
                    "s": pa.array(list(sums), pa.list_(pa.int64())),
                    "n": pa.array(cnt, pa.int64()),
                }
            )

        def combine(g: pd.DataFrame) -> pd.DataFrame:
            s = np.stack(g["s"].to_numpy()).sum(axis=0, dtype=np.int64)
            return pd.DataFrame(
                {
                    "cid": [int(g["cid"].iloc[0])],
                    "s": [s],
                    "n": [int(g["n"].sum())],
                }
            )

        red = (
            q.map_batches(partial, batch_format="pyarrow")
            .groupby("cid")
            .map_groups(combine, batch_format="pandas")
            .to_pandas()
            .sort_values("cid")
        )
        new = cent.copy()
        for r in red.itertuples():
            if r.n > 0:
                new[int(r.cid)] = np.floor_divide(
                    np.asarray(r.s, dtype=np.int64), np.int64(r.n)
                )
        cent = new

    c_ref = ray.put(cent)

    def final(b: pa.Table) -> pa.Table:
        c = ray.get(c_ref)
        if b.num_rows == 0:
            return pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "cluster_id": pa.array([], pa.int64()),
                    "dist_q": pa.array([], pa.int64()),
                }
            )
        qm = np.stack(b.column("q").to_numpy(zero_copy_only=False))
        cid, dist = assign(qm, c)
        return pa.table(
            {
                "vec_id": b.column("vec_id"),
                "cluster_id": pa.array(cid, pa.int64()),
                "dist_q": pa.array(dist.astype(np.int64), pa.int64()),
            }
        )

    return q.map_batches(final, batch_format="pyarrow")


def embedding_gram(ds, id_col: str = "vec_id", vec_col: str = "embedding"):
    """Exact d x d Gram matrix (sum over vectors of q qᵀ) of the
    fixed-point-quantized embedding column — the building block for
    covariance/PCA/whitening at corpus scale.

    Quantization is the shared ``floor(x * 2^20 + 0.5)`` int64 contract
    (see kmeans_fixed), so each per-batch contribution is ONE int64
    matmul and the global reduction is an exact integer groupby-sum of
    d² cells per block — order-free, parallelism-invariant, bit-exact in
    SQL. Also emits the per-dimension sums (row i = -1) and the vector
    count (i = -2, j = 0), so a caller can form the centered covariance
    on the driver. int64 headroom: |q| <= 2^21 ⇒ a cell overflows only
    past ~2^21 vectors per block and ~2^63 total — chunk like
    group_pearson if embeddings ever exceed that.

    Output rows: (i, j, v) for 0 <= i <= j < d (upper triangle), plus
    the auxiliary rows above.
    """

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {
                    "i": pa.array([], pa.int64()),
                    "j": pa.array([], pa.int64()),
                    "v": pa.array([], pa.int64()),
                }
            )
        emb = np.stack(b.column(vec_col).to_numpy(zero_copy_only=False))
        q = _quantize(emb)
        d = q.shape[1]
        gram = q.T @ q  # (d, d) int64, exact
        iu, ju = np.triu_indices(d)
        sums = q.sum(axis=0, dtype=np.int64)
        i = np.concatenate([iu, np.full(d, -1, np.int64), [-2]])
        j = np.concatenate([ju, np.arange(d), [0]])
        v = np.concatenate([gram[iu, ju], sums, [np.int64(len(q))]])
        return pa.table(
            {
                "i": pa.array(i, pa.int64()),
                "j": pa.array(j, pa.int64()),
                "v": pa.array(v, pa.int64()),
            }
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["i", "j"])
        .sum("v")
    )
    return out.map_batches(
        lambda b: b.rename_columns(["i", "j", "v"]), batch_format="pyarrow"
    )


def linreg_fit(ds, x_cols: list[str], y_col: str):
    """Distributed ordinary least squares via EXACT integer normal
    equations + Cramer's rule — the closed-form regression fit a quality
    model needs, without SGD nondeterminism.

    The only exchange is the tiny moment vector: each batch collapses to
    one row of integer sums (Sx, Sxx upper triangle, Sxy, Sy, n); one
    groupby-sum merges them; the finalize solves the (d+1)x(d+1) system
    with PYTHON BIG-INT Cramer determinants (exact — no float drift, no
    conditioning concerns at these magnitudes) and projects to float64
    only at the very end (float(num)/float(det), the same two IEEE ops
    the SQL oracle performs — bit-exact).

    Inputs must be integer-valued columns. Returns ONE row:
    (n, det, coef_0..coef_d, det_f, num_0..num_d) where coef_i =
    float(num_i)/float(det) and coef_0 is the intercept.
    """
    import pandas as pd

    d = len(x_cols)
    names = []
    for i in range(d + 1):
        for j in range(i, d + 1):
            names.append(f"s_{i}_{j}")
    ynames = [f"sy_{i}" for i in range(d + 1)]

    def partial(b: pa.Table) -> pa.Table:
        cols = [np.ones(b.num_rows, np.int64)] + [
            b.column(c).to_numpy().astype(np.int64) for c in x_cols
        ]
        y = b.column(y_col).to_numpy().astype(np.int64)
        out = {"g": pa.array([0], pa.int64())}
        for i in range(d + 1):
            for j in range(i, d + 1):
                out[f"s_{i}_{j}"] = pa.array(
                    [int((cols[i] * cols[j]).sum())], pa.int64()
                )
        for i in range(d + 1):
            out[f"sy_{i}"] = pa.array([int((cols[i] * y).sum())], pa.int64())
        return pa.table(out)

    parts = ds.map_batches(partial, batch_format="pyarrow")
    agg = parts.groupby("g").sum(names + ynames)

    def final(b: pa.Table) -> pa.Table:
        b = b.rename_columns(["g"] + names + ynames)
        S = [[0] * (d + 1) for _ in range(d + 1)]
        for i in range(d + 1):
            for j in range(i, d + 1):
                v = int(b.column(f"s_{i}_{j}")[0].as_py())
                S[i][j] = v
                S[j][i] = v
        Y = [int(b.column(f"sy_{i}")[0].as_py()) for i in range(d + 1)]

        def det(m) -> int:
            # exact big-int determinant, Laplace on the first row
            k = len(m)
            if k == 1:
                return m[0][0]
            total = 0
            for c in range(k):
                minor = [row[:c] + row[c + 1 :] for row in m[1:]]
                total += (-1) ** c * m[0][c] * det(minor)
            return total

        D = det(S)
        nums = []
        for i in range(d + 1):
            M = [[Y[r] if c == i else S[r][c] for c in range(d + 1)]
                 for r in range(d + 1)]
            nums.append(det(M))
        out = {
            "n": pa.array([S[0][0]], pa.int64()),
            "det_f": pa.array([float(D)], pa.float64()),
        }
        for i, nm in enumerate(nums):
            out[f"num_{i}"] = pa.array([float(nm)], pa.float64())
            out[f"coef_{i}"] = pa.array(
                [float(nm) / float(D)] if D != 0 else [float("nan")],
                pa.float64(),
            )
        return pa.table(out)

    return agg.map_batches(final, batch_format="pyarrow")


def label_centroids(ds, group_col: str = "label", vec_col: str = "embedding"):
    """Exact per-group embedding centroids — the class-prototype builder
    (semdedup cluster centers, nearest-class-mean classification).

    Per batch, one int64 matmul-free segmented sum collapses all vectors to
    (group, dim, sum_q, n) rows — the exchange is groups x dims, never
    vectors; a native groupby-sum merges. Fixed-point quantization (the
    kmeans/_quantize scale) makes every sum order-independent; the float
    centroid is the single division float(sum_q) / float(n * SCALE).
    """
    import pandas as pd

    def partial(b: pa.Table) -> pa.Table:
        emb = np.asarray(
            b.column(vec_col).combine_chunks().values.to_numpy(
                zero_copy_only=False
            ),
            dtype=np.float64,
        )
        n = b.num_rows
        if n == 0:
            return pa.table(
                {
                    "label": pa.array([], pa.int64()),
                    "dim": pa.array([], pa.int64()),
                    "sum_q": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        d = len(emb) // n
        q = _quantize(emb).reshape(n, d)
        lab = b.column(group_col).to_numpy().astype(np.int64)
        order = np.argsort(lab, kind="stable")
        lab_s = lab[order]
        q_s = q[order]
        uniq, starts = np.unique(lab_s, return_index=True)
        sums = np.add.reduceat(q_s, starts, axis=0)  # (g, d) int64
        cnts = np.diff(np.append(starts, n))
        g = len(uniq)
        return pa.table(
            {
                "label": pa.array(np.repeat(uniq, d), pa.int64()),
                "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), g), pa.int64()),
                "sum_q": pa.array(sums.ravel(), pa.int64()),
                "n": pa.array(np.repeat(cnts.astype(np.int64), d), pa.int64()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow")
    agg = parts.groupby(["label", "dim"]).sum(["sum_q", "n"])

    def final(b: pa.Table) -> pa.Table:
        b = b.rename_columns(["label", "dim", "sum_q", "n"])
        sq = b.column("sum_q").to_numpy().astype(np.int64)
        n = b.column("n").to_numpy().astype(np.int64)
        return pa.table(
            {
                "label": b.column("label").cast(pa.int64()),
                "dim": b.column("dim").cast(pa.int64()),
                "sum_q": pa.array(sq, pa.int64()),
                "n": pa.array(n, pa.int64()),
                "centroid": pa.array(
                    sq.astype(np.float64) / (n * _SCALE).astype(np.float64),
                    pa.float64(),
                ),
            }
        )

    return agg.map_batches(final, batch_format="pyarrow")
