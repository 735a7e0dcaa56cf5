"""Fuzzy string matching / record linkage: all pairs of DISTINCT strings
within a Levenshtein edit distance threshold.

The canonical entity-resolution primitive (near-identical titles, product
names, author strings). Shape:

1. **distinct**: per-batch ``np.unique`` partials + one groupby — the
   corpus collapses to its vocabulary before any pairing;
2. **lossless length blocking**: an edit script of cost <= t changes
   length by at most t, so every qualifying pair meets in the group keyed
   by the LONGER string's length (each string is sent to groups
   ``len .. len+t`` — duplication factor t+1, pair met exactly once:
   cross-length pairs in the longer group, equal-length pairs in their
   own group under ``a < b``);
3. **verify**: one vectorized Levenshtein DP across the whole candidate
   batch (unit insert/delete/substitute — DuckDB ``levenshtein``
   semantics), O(Lmax²) fused numpy steps over all pairs at once, no
   per-pair Python.

At web scale, length-only blocks can be large (every string of one
length); the documented refinement is PassJoin-style segment blocking
(split into t+1 segments, pigeonhole on one exact segment — the same
pigeonhole trick as simhash banding). Strings longer than ``max_len``
are rejected: the DP cost is quadratic and a different blocking (q-gram
prefix filtering) is the right tool there.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _levenshtein_block(a_enc, b_enc, a_len, b_len):
    """Vectorized edit distance for n pairs. a_enc/b_enc: (n, Lmax) uint8
    padded codes; returns (n,) int64."""
    n, _ = a_enc.shape
    la = int(a_len.max()) if n else 0
    lb = int(b_len.max()) if n else 0
    big = np.int64(1 << 30)
    prev = np.tile(np.arange(lb + 1, dtype=np.int64), (n, 1))
    # positions beyond a pair's own length are masked to BIG so they never
    # win a minimum; final answer read at (a_len, b_len) per pair
    cols = np.arange(lb + 1)[None, :]
    prev = np.where(cols <= b_len[:, None], prev, big)
    for i in range(1, la + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = np.where(i <= a_len, i, big)
        sub = prev[:, :-1] + (
            a_enc[:, i - 1 : i] != b_enc[:, :lb]
        ).astype(np.int64)
        dele = prev[:, 1:] + 1
        base = np.minimum(sub, dele)
        # insert transitions are a running min along j: unrolling
        # cur[j] = min(base[j], cur[j-1]+1) gives
        # cur[j] = min_{k<=j-1}((m[k]) + j) vs base[j], with
        # m[k] = base[k]-k (m[0] = cur[0]) — a prefix scan via
        # minimum.accumulate, still vectorized across pairs
        run = np.minimum.accumulate(
            np.concatenate([cur[:, :1], base], axis=1)
            - np.arange(lb + 1)[None, :],
            axis=1,
        )
        ins = run[:, :-1] + np.arange(1, lb + 1)[None, :]
        cur[:, 1:] = np.minimum(base, ins)
        cur[:, 1:] = np.where(cols[:, 1:] <= b_len[:, None], cur[:, 1:], big)
        rows_on = i <= a_len
        prev = np.where(rows_on[:, None], cur, prev)
    return prev[np.arange(n), b_len]


def edit_distance_pairs(
    ds,
    col: str,
    max_dist: int = 2,
    max_len: int = 64,
):
    """All unordered pairs of distinct values of ``col`` with Levenshtein
    distance in [1, max_dist]. Output: (name_a, name_b, dist) with
    name_a < name_b lexicographically."""
    if max_dist < 1:
        raise ValueError("edit_distance_pairs: max_dist must be >= 1")
    t = int(max_dist)

    def distinct_partial(b: pa.Table) -> pa.Table:
        vals = np.unique(b.column(col).to_numpy(zero_copy_only=False))
        return pa.table({"name": pa.array(vals.astype(object), pa.string())})

    distinct = (
        ds.map_batches(distinct_partial, batch_format="pyarrow")
        .groupby("name")
        .count()
    )

    def block(b: pa.Table) -> pa.Table:
        names = b.column("name").to_pylist()
        out_g: list[int] = []
        out_n: list[str] = []
        for s in names:
            ln = len(s)
            if ln > max_len:
                raise ValueError(
                    f"edit_distance_pairs: string longer than max_len="
                    f"{max_len} (use q-gram blocking for long strings)"
                )
            for g in range(ln, ln + t + 1):
                out_g.append(g)
                out_n.append(s)
        return pa.table(
            {
                "g": pa.array(out_g, pa.int64()),
                "name": pa.array(out_n, pa.string()),
            }
        )

    def verify(grp: pd.DataFrame) -> pd.DataFrame:
        gl = int(grp["g"].iloc[0])
        names = grp["name"].tolist()
        lens = np.array([len(s) for s in names], dtype=np.int64)
        long_i = np.flatnonzero(lens == gl)
        # candidates: (x of length g) x (y of length in [g-t, g]); for
        # equal lengths require x < y so each pair verifies exactly once.
        # Vectorized cross product + masks — no per-pair Python.
        yy = np.arange(len(names))
        X, Y = np.meshgrid(long_i, yy, indexing="ij")
        X, Y = X.ravel(), Y.ravel()
        ly = lens[Y]
        names_arr = np.asarray(names, dtype=object)
        eq = ly == gl
        keep_pairs = (X != Y) & (
            (eq & (names_arr[X] < names_arr[Y]))
            | (~eq & (ly >= gl - t) & (ly < gl))
        )
        ai = X[keep_pairs]
        bi = Y[keep_pairs]
        if len(ai) == 0:
            return pd.DataFrame(
                {
                    "name_a": pd.Series([], dtype=object),
                    "name_b": pd.Series([], dtype=object),
                    "dist": pd.Series([], dtype=np.int64),
                }
            )
        enc = np.zeros((len(names), max_len), dtype=np.int32)
        for i, s in enumerate(names):
            enc[i, : len(s)] = np.frombuffer(
                s.encode("utf-32-le"), dtype=np.uint32
            ).astype(np.int32)
        d = _levenshtein_block(
            enc[ai], enc[bi], lens[np.array(ai)], lens[np.array(bi)]
        )
        keep = (d >= 1) & (d <= t)
        na = [names[i] for i, k in zip(ai, keep) if k]
        nb = [names[i] for i, k in zip(bi, keep) if k]
        dd = d[keep]
        lo = [min(a, b) for a, b in zip(na, nb)]
        hi = [max(a, b) for a, b in zip(na, nb)]
        return pd.DataFrame(
            {
                "name_a": lo,
                "name_b": hi,
                "dist": dd.astype(np.int64),
            }
        )

    return (
        distinct.map_batches(block, batch_format="pyarrow")
        .groupby("g")
        .map_groups(verify, batch_format="pandas")
    )
