"""Sequence packing for LLM training: concat-and-chunk documents into
fixed-budget training examples.

GPT-style packing concatenates the token stream in a canonical document
order and cuts it every ``budget`` tokens; a document therefore maps to one
or more (example_id, tok_start, tok_end) spans. The primitive this needs is
a GLOBAL PREFIX SUM over per-document token counts in doc-id order — the
same zipWithIndex shape as stages.shuffle.deterministic_shuffle, built the
same scalable way:

1. a NARROW (doc_id, n_tokens) projection is computed and materialized
   (token counting never re-runs, payload text never checkpoints);
2. doc-ids map to ORDER-PRESERVING range buckets; per-batch partial bucket
   sums (<= num_buckets rows per block) merge on the driver into exclusive
   per-bucket offsets — the only driver-side data is the histogram;
3. ``groupby(bucket)``: sort the group by doc_id, cumulative-sum the counts,
   and emit each doc's example spans with vectorized repeat/arange math.

Rows shuffle once (the groupby) carrying ~16 B each; the span fan-out is
bounded by total_tokens / budget extra rows. SQL-oracle-able: the prefix
sum is ``SUM(n) OVER (ORDER BY doc_id)`` and the span fan-out a range join
(__ray_entry__.py token_pack oracle, bit-exact).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray


def token_count_batch(
    batch: pa.Table, id_col: str = "doc_id", text_col: str = "text"
) -> pa.Table:
    """(doc_id, n_tokens) projection; whitespace tokens, empties dropped —
    matches DuckDB ``len(list_filter(string_split(text, ' '), x -> x <> ''))``."""
    ids = batch.column(id_col).to_numpy()
    texts = batch.column(text_col).to_pylist()
    ns = np.fromiter(
        (sum(1 for w in (t or "").split(" ") if w) for t in texts),
        dtype=np.int64,
        count=len(texts),
    )
    return pa.table(
        {
            id_col: pa.array(ids, pa.int64()),
            "n": pa.array(ns, pa.int64()),
        }
    )


def pack_sequences(
    ds,
    budget: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 64,
):
    """Assign every document its training-example spans under concat-and-chunk
    packing with ``budget`` tokens per example.

    Returns a Dataset of (doc_id, example_id, tok_start, tok_end): the
    document's tokens [tok_start, tok_end) belong to example ``example_id``
    (multiple rows when a document straddles a chunk boundary). Zero-token
    documents emit no rows. Deterministic at any parallelism: the pack order
    is doc_id order, independent of block layout.
    """
    budget = int(budget)
    if budget <= 0:
        raise ValueError(f"Invalid budget: {budget}")

    proj = (
        ds.select_columns([id_col, text_col])
        .map_batches(
            lambda b: token_count_batch(b, id_col, text_col),
            batch_format="pyarrow",
        )
        .materialize()
    )
    lo = proj.min(id_col)
    hi = proj.max(id_col)
    if lo is None:  # empty input
        return ray.data.from_arrow(
            pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "example_id": pa.array([], pa.int64()),
                    "tok_start": pa.array([], pa.int64()),
                    "tok_end": pa.array([], pa.int64()),
                }
            )
        )
    width = max(1, (int(hi) - int(lo) + num_buckets) // num_buckets)

    def attach_bucket(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_numpy()
        bk = (ids - lo) // width  # order-preserving range bucket
        return b.append_column("__bucket", pa.array(bk.astype(np.int64)))

    bucketed = proj.map_batches(attach_bucket, batch_format="pyarrow")

    # histogram WITHOUT a shuffle: per-batch partial (bucket, sum) rows
    def _bucket_sums(b: pa.Table) -> pa.Table:
        bk = b.column("__bucket").to_numpy()
        ns = b.column("n").to_numpy()
        vals, inv = np.unique(bk, return_inverse=True)
        sums = np.bincount(inv, weights=ns).astype(np.int64)
        return pa.table(
            {
                "__bucket": pa.array(vals.astype(np.int64), pa.int64()),
                "s": pa.array(sums, pa.int64()),
            }
        )

    hist = (
        bucketed.map_batches(_bucket_sums, batch_format="pyarrow")
        .to_pandas()
        .groupby("__bucket")["s"]
        .sum()
        .sort_index()
    )
    offsets = dict(
        zip(
            hist.index.astype(int),
            np.concatenate([[0], np.cumsum(hist.to_numpy())[:-1]]),
        )
    )
    off_ref = ray.put(offsets)

    def emit_spans(g: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(off_ref)
        bkt = int(g["__bucket"].iloc[0])
        g = g.sort_values(id_col, kind="mergesort")
        ids = g[id_col].to_numpy(np.int64)
        ns = g["n"].to_numpy(np.int64)
        starts = int(off[bkt]) + np.cumsum(ns) - ns  # exclusive prefix sum
        keep = ns > 0
        ids, ns, starts = ids[keep], ns[keep], starts[keep]
        if len(ids) == 0:
            return pd.DataFrame(
                {
                    id_col: pd.Series([], dtype=np.int64),
                    "example_id": pd.Series([], dtype=np.int64),
                    "tok_start": pd.Series([], dtype=np.int64),
                    "tok_end": pd.Series([], dtype=np.int64),
                }
            )
        e0 = starts // budget
        e1 = (starts + ns - 1) // budget
        reps = e1 - e0 + 1
        tot = int(reps.sum())
        # per-row example index: 0..reps_i-1 via the repeat/arange identity
        idx = np.arange(tot, dtype=np.int64) - np.repeat(
            np.cumsum(reps) - reps, reps
        )
        ex = np.repeat(e0, reps) + idx
        st = np.repeat(starts, reps)
        nn = np.repeat(ns, reps)
        return pd.DataFrame(
            {
                id_col: np.repeat(ids, reps),
                "example_id": ex,
                "tok_start": np.maximum(0, ex * budget - st),
                "tok_end": np.minimum(nn, (ex + 1) * budget - st),
            }
        )

    return bucketed.groupby("__bucket").map_groups(
        emit_spans, batch_format="pandas"
    )
