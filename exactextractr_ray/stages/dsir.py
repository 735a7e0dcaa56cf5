"""DSIR — Data Selection via Importance Resampling (Xie et al., NeurIPS
2023) over hashed-bigram features, Ray-Data-first.

The published method estimates two bag-of-hashed-ngrams models — a TARGET
distribution (the domain you want more of) and the RAW distribution (the
crawl) — and keeps the raw examples with the highest importance weight
p_target(features) / p_raw(features).

This implementation keeps the method's structure with one deliberate,
documented change for oracle bit-exactness: per-bucket likelihood ratios
are FIXED-POINT INTEGERS in linear space,

    w[b] = ((t[b] + 1) * PREC) // (r[b] + 1)

(add-one smoothing; the constant (R+B)/(T+B) normalizer is dropped — it
rescales every document identically, so selection order is unchanged),
and the document score is the exact int64 sum of w over its bigram
occurrences instead of a float sum of logs.  Because the target corpus
is a SUBSET of the raw corpus here (membership is a text predicate),
t[b] <= r[b] and each w fits in PREC+1, so scores stay integer-exact in
both numpy and the DuckDB oracle with no float summation-order hazard.

Scale shape (100 TB): pass 1 streams text once and emits per-block DENSE
(bucket, target_cnt, raw_cnt) partials — the one shuffle moves
n_buckets rows per block, never text — and the final (n_buckets)-row
model table is the ONLY driver materialization (bounded: 4096 rows),
broadcast once via ray.put.  Pass 2 streams text again, scores each
batch vectorized against the broadcast weight array, and keeps a
deterministic per-block top-k partial so the single finalize group sees
at most k rows per block (the tfidf/bm25 shape in stages/text.py).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

#: fixed-point scale for the likelihood-ratio weights
DSIR_PREC = 1 << 20


def _bigram_buckets(text: str, n_buckets: int) -> np.ndarray:
    """Hashed-bigram feature indices for one document: whitespace tokens
    (empties dropped), consecutive pairs joined with one space, md5 first
    8 hex digits mod n_buckets — the exact recipe the SQL oracle replays
    with ``('0x' || substr(md5(w1 || ' ' || w2), 1, 8))::UBIGINT``."""
    toks = [x for x in (text or "").split(" ") if x]
    if len(toks) < 2:
        return np.empty(0, dtype=np.int64)
    return np.fromiter(
        (
            int(hashlib.md5((a + " " + b).encode()).hexdigest()[:8], 16) % n_buckets
            for a, b in zip(toks, toks[1:])
        ),
        dtype=np.int64,
        count=len(toks) - 1,
    )


def dsir_topk(
    ds,
    target_substr: str,
    k: int = 100,
    n_buckets: int = 4096,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Select the ``k`` documents whose hashed-bigram features look most
    like the target domain, where the target corpus is the subset of
    documents whose text contains ``target_substr`` (any deterministic
    predicate works; a substring keeps the oracle one LIKE away).

    Returns a Dataset of (doc_id, score) — score is the exact int64
    importance score, ranked (score DESC, doc_id ASC).
    """
    import ray

    if k < 1:
        raise ValueError("dsir_topk: k must be >= 1")
    if not target_substr:
        raise ValueError("dsir_topk: target_substr must be non-empty")

    # ---- pass 1: per-block dense bucket-count partials -> one bounded agg
    def count_partial(b: pa.Table) -> pa.Table:
        texts = b.column(text_col).to_pylist()
        tgt = np.zeros(n_buckets, dtype=np.int64)
        raw = np.zeros(n_buckets, dtype=np.int64)
        for t in texts:
            idx = _bigram_buckets(t, n_buckets)
            if idx.size == 0:
                continue
            np.add.at(raw, idx, 1)
            if target_substr in (t or ""):
                np.add.at(tgt, idx, 1)
        return pa.table(
            {
                "bucket": pa.array(np.arange(n_buckets), pa.int64()),
                "t": pa.array(tgt),
                "r": pa.array(raw),
            }
        )

    model = (
        ds.map_batches(count_partial, batch_format="pyarrow")
        .groupby("bucket")
        .sum(["t", "r"])
        .to_pandas()
        .sort_values("bucket")
    )
    t_cnt = np.zeros(n_buckets, dtype=np.int64)
    r_cnt = np.zeros(n_buckets, dtype=np.int64)
    bk = model["bucket"].to_numpy(np.int64)
    t_cnt[bk] = model["sum(t)"].to_numpy(np.int64)
    r_cnt[bk] = model["sum(r)"].to_numpy(np.int64)
    # target is a subset of raw => t <= r => w <= PREC, and a document's
    # score is bounded by n_bigrams * PREC — comfortably inside int64
    w = ((t_cnt + 1) * DSIR_PREC) // (r_cnt + 1)
    w_ref = ray.put(w)

    # ---- pass 2: vectorized scoring + per-block deterministic top-k
    def score_partial(b: pa.Table) -> pa.Table:
        ww = ray.get(w_ref)
        ids = b.column(id_col).to_numpy().astype(np.int64)
        texts = b.column(text_col).to_pylist()
        score = np.fromiter(
            (int(ww[_bigram_buckets(t, n_buckets)].sum()) for t in texts),
            dtype=np.int64,
            count=len(texts),
        )
        # score-0 docs (no bigrams, or all-zero floored weights) are
        # excluded on BOTH sides — the oracle's per-doc join emits no row
        # for them
        pos = score > 0
        ids, score = ids[pos], score[pos]
        kk = min(k, len(ids))
        ord_ = np.lexsort((ids, -score))[:kk]
        return pa.table(
            {
                "g": pa.array(np.zeros(kk, np.int64), pa.int64()),
                id_col: pa.array(ids[ord_]),
                "score": pa.array(score[ord_]),
            }
        )

    cand = ds.map_batches(score_partial, batch_format="pyarrow")

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", id_col], ascending=[False, True]).head(k)
        return g[[id_col, "score"]].reset_index(drop=True)

    return cand.groupby("g").map_groups(finalize, batch_format="pandas")
