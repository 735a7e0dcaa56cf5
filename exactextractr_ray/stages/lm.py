"""CCNet-style n-gram LM quality bucketing (Wenzek et al., LREC 2020),
Ray-Data-first.

The published pipeline trains a 5-gram KenLM on a reference corpus
(Wikipedia), scores every crawled document by perplexity under that
model, and splits each language's corpus into HEAD / MIDDLE / TAIL
perplexity terciles — the standard web-corpus quality partition. This
module keeps that structure over a hashed-BIGRAM model: the reference
corpus is the subset of documents matching a deterministic predicate
(``train_substr in text`` — any predicate works; a substring keeps the
oracle one LIKE away, the same device as stages/dsir.py), and every
document is scored by mean per-token surprisal under the trained model.

Deliberate, documented change for oracle bit-exactness (the fixed-point
device established in stages/dsir.py): per-token surprisal is the
FIXED-POINT INTEGER inverse conditional probability

    surp(w1, w2) = ((c_ctx(h(w1)) + B) * PREC) // (c_pair(h(w1 w2)) + 1)

— the add-one-smoothed inverse of p(w2 | w1) in LINEAR space — instead
of a float log-prob. The document score is then an exact int64 sum, the
per-token mean an exact integer division, and the tercile an exact rank,
so numpy and the DuckDB oracle agree to the last bit with no float
summation-order hazard. Ranking by the sum of inverse probabilities
(the harmonic-mean probability) orders documents the same direction as
perplexity: fluent reference-like text scores low, gibberish high. (A
production run at extreme scale would switch surp to a float log — the
int64 headroom bound is documented on :func:`lm_perplexity_buckets`.)

Tokenization / hashing recipe (shared verbatim with the SQL oracle and
stages/dsir.py): whitespace-split dropping empties; context bucket
``md5(w1)[:8] % B``; pair bucket ``md5(w1 + ' ' + w2)[:8] % B``; context
counts are bigram-START counts (the last token of a document is never a
context), exactly the ``i < len(w)`` join the oracle uses.

Scale shape (100 TB):

* pass 1 streams text once and emits per-block DENSE
  (bucket, ctx_cnt, pair_cnt) partials — the only shuffle moves
  ``n_buckets`` rows per block, never text; the final model is ONE
  bounded (n_buckets)-row table, broadcast once via ``ray.put``;
* pass 2 streams text once more and scores each batch vectorized
  against the two broadcast count arrays, emitting one NARROW
  (doc_id, n_pairs, score, ppl_fp) int64 row per document — payload
  text never shuffles;
* pass 3 assigns terciles by EXACT global rank over (ppl_fp, doc_id)
  without sorting the corpus: scored rows land in ``rank_buckets``
  ORDERED value-range buckets, per-block bucket histograms (at most
  ``rank_buckets`` rows each) prefix-sum on the driver, and each bucket
  group sorts locally and adds its offset — the deterministic_shuffle
  zipWithIndex shape (stages/shuffle.py:58) keyed by value range
  instead of hash.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

#: fixed-point scale for the surprisal weights
LM_PREC = 1 << 20

#: ordered value-range buckets for the rank pass
RANK_BUCKETS = 1024


def _token_buckets(text: str, n_buckets: int):
    """(ctx_bucket[i], pair_bucket[i]) arrays for one document — one entry
    per bigram position i (empty for docs with < 2 tokens)."""
    toks = [x for x in (text or "").split(" ") if x]
    n = len(toks) - 1
    if n < 1:
        e = np.empty(0, dtype=np.int64)
        return e, e
    ctx = np.fromiter(
        (
            int(hashlib.md5(w.encode()).hexdigest()[:8], 16) % n_buckets
            for w in toks[:-1]
        ),
        dtype=np.int64,
        count=n,
    )
    pair = np.fromiter(
        (
            int(hashlib.md5((a + " " + b).encode()).hexdigest()[:8], 16)
            % n_buckets
            for a, b in zip(toks, toks[1:])
        ),
        dtype=np.int64,
        count=n,
    )
    return ctx, pair


def _ntile3(rank: np.ndarray, n_total: int) -> np.ndarray:
    """SQL NTILE(3) over a 0-based global rank: buckets 1..3 as equal as
    possible, earlier buckets one larger when n_total % 3 != 0."""
    size, rem = divmod(int(n_total), 3)
    b1 = size + (1 if rem >= 1 else 0)
    b2 = b1 + size + (1 if rem >= 2 else 0)
    out = np.full(rank.shape, 3, dtype=np.int64)
    out[rank < b2] = 2
    out[rank < b1] = 1
    return out


def lm_perplexity_buckets(
    ds,
    train_substr: str,
    n_buckets: int = 4096,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Train a hashed-bigram LM on documents containing ``train_substr``,
    score every document (>= 2 tokens) by exact fixed-point mean
    surprisal, and assign CCNet head/middle/tail terciles.

    Returns a Dataset of (doc_id, n_pairs, ppl_fp, bucket): ``ppl_fp`` is
    the integer per-token surprisal ``score // n_pairs``; ``bucket`` is
    NTILE(3) over (ppl_fp ASC, doc_id ASC) — 1 = head (most fluent),
    3 = tail.

    int64 headroom: score < n_pairs * (train_bigrams + B) * PREC, so the
    exact path is safe while doc_len * corpus_train_tokens < 2**43; for
    larger corpora lower ``LM_PREC`` or switch pass 2 to float log-probs
    (documented above).
    """
    import ray

    if not train_substr:
        raise ValueError("lm_perplexity_buckets: train_substr required")

    # ---- pass 1: dense per-block (ctx, pair) count partials over the
    # reference subset -> one bounded model table -> broadcast arrays
    def count_partial(b: pa.Table) -> pa.Table:
        texts = b.column(text_col).to_pylist()
        ctx_cnt = np.zeros(n_buckets, dtype=np.int64)
        pair_cnt = np.zeros(n_buckets, dtype=np.int64)
        for t in texts:
            if train_substr not in (t or ""):
                continue
            ctx, pair = _token_buckets(t, n_buckets)
            if ctx.size:
                np.add.at(ctx_cnt, ctx, 1)
                np.add.at(pair_cnt, pair, 1)
        return pa.table(
            {
                "bucket": pa.array(np.arange(n_buckets), pa.int64()),
                "c": pa.array(ctx_cnt),
                "p": pa.array(pair_cnt),
            }
        )

    model = (
        ds.map_batches(count_partial, batch_format="pyarrow")
        .groupby("bucket")
        .sum(["c", "p"])
        .to_pandas()
        .sort_values("bucket")
    )
    ctx_cnt = np.zeros(n_buckets, dtype=np.int64)
    pair_cnt = np.zeros(n_buckets, dtype=np.int64)
    bk = model["bucket"].to_numpy(np.int64)
    ctx_cnt[bk] = model["sum(c)"].to_numpy(np.int64)
    pair_cnt[bk] = model["sum(p)"].to_numpy(np.int64)
    model_ref = ray.put((ctx_cnt, pair_cnt))

    # ---- pass 2: vectorized scoring, one narrow int64 row per doc
    def score_partial(b: pa.Table) -> pa.Table:
        cc, pc = ray.get(model_ref)
        ids = b.column(id_col).to_numpy().astype(np.int64)
        texts = b.column(text_col).to_pylist()
        out_id, out_n, out_s = [], [], []
        for i, t in enumerate(texts):
            ctx, pair = _token_buckets(t, n_buckets)
            if ctx.size == 0:
                continue
            surp = ((cc[ctx] + n_buckets) * LM_PREC) // (pc[pair] + 1)
            out_id.append(ids[i])
            out_n.append(ctx.size)
            out_s.append(int(surp.sum()))
        score = np.asarray(out_s, dtype=np.int64)
        n = np.asarray(out_n, dtype=np.int64)
        return pa.table(
            {
                id_col: pa.array(np.asarray(out_id, dtype=np.int64)),
                "n_pairs": pa.array(n),
                "ppl_fp": pa.array(
                    score // np.maximum(n, 1), pa.int64()
                ),
            }
        )

    scored = ds.map_batches(score_partial, batch_format="pyarrow")
    scored = scored.materialize()  # narrow int64 rows; read 3x below

    # ---- pass 3: exact global rank -> NTILE(3), no corpus sort
    max_ppl = scored.max("ppl_fp")
    if max_ppl is None:
        return scored.map_batches(
            lambda b: b.append_column(
                "bucket", pa.array([], pa.int64())
            ),
            batch_format="pyarrow",
        )
    max_ppl = int(max_ppl)

    def add_ob(b: pa.Table) -> pa.Table:
        ppl = b.column("ppl_fp").to_numpy()
        ob = ppl * RANK_BUCKETS // (max_ppl + 1)
        return b.append_column("__ob", pa.array(ob, pa.int64()))

    with_ob = scored.map_batches(add_ob, batch_format="pyarrow")

    def ob_hist(b: pa.Table) -> pa.Table:
        vals, cnts = np.unique(
            b.column("__ob").to_numpy(), return_counts=True
        )
        return pa.table(
            {
                "__ob": pa.array(vals.astype(np.int64), pa.int64()),
                "n": pa.array(cnts.astype(np.int64), pa.int64()),
            }
        )

    hist = (
        with_ob.map_batches(ob_hist, batch_format="pyarrow")
        .to_pandas()
        .groupby("__ob")["n"]
        .sum()
        .sort_index()
    )
    n_total = int(hist.sum())
    offsets = dict(
        zip(
            hist.index.astype(int),
            np.concatenate([[0], np.cumsum(hist.to_numpy())[:-1]]),
        )
    )
    off_ref = ray.put(offsets)

    def bucketize(g: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(off_ref)
        ob = int(g["__ob"].iloc[0])
        g = g.sort_values(
            ["ppl_fp", id_col], kind="mergesort"
        ).reset_index(drop=True)
        rank = int(off[ob]) + np.arange(len(g), dtype=np.int64)
        g["bucket"] = _ntile3(rank, n_total)
        return g[[id_col, "n_pairs", "ppl_fp", "bucket"]]

    return with_ob.groupby("__ob").map_groups(
        bucketize, batch_format="pandas"
    )
