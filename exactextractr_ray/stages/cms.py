"""Count-min sketch over a token stream — bounded-state frequency
estimation for heavy-hitter mining on corpora whose vocabulary cannot be
held exactly (the standard web-scale companion to the exact
``ngram_counts`` pipeline, like KMV is to exact ``variety``).

Everything is order-independent by construction, so the distributed result
is deterministic and a DuckDB oracle can reproduce it bit-for-bit:

* the sketch is ``d`` rows of ``w`` int64 counters; per-batch partials add
  occurrence counts into buckets and the merge is a plain integer SUM
  (groupby over at most ``d*w`` sparse slots — the shuffle carries the
  sketch, never the corpus);
* bucket choice is the SQL-expressible md5 hash used repo-wide:
  ``md5(f"{row}:{token}")`` top-16-hex as uint64, mod ``w``;
* the point estimate is ``min`` over the ``d`` rows — pure int arithmetic.

The finished sketch is ``d*w*8`` bytes (a few KiB): it is collected once
and broadcast via ``ray.put``; estimation then streams over whatever
candidate set the caller has (here: the distinct-token stream, which at
real scale would be replaced by a candidate feed — the sketch itself never
needs the vocabulary).
"""

from __future__ import annotations

import hashlib
from collections import Counter

import numpy as np
import pyarrow as pa


def _bucket(row: int, token: str, w: int) -> int:
    h = int(hashlib.md5(f"{row}:{token}".encode()).hexdigest()[:16], 16)
    return h % w


def cms_build(ds, text_col: str = "text", d: int = 4, w: int = 32) -> np.ndarray:
    """Build the (d, w) int64 count-min sketch of token occurrences.

    Tokens are ``text.split(' ')`` (consecutive spaces yield empty tokens,
    matching DuckDB ``string_split``). One map_batches pass emits sparse
    (slot, cnt) partials; one groupby-sum merges; the <= d*w result rows
    are collected (bounded state, like the KMV/bloom patterns).
    """

    def partial(b: pa.Table) -> pa.Table:
        cnt: Counter = Counter()
        for t in b.column(text_col).to_pylist():
            cnt.update(t.split(" "))
        slots = np.zeros(d * w, dtype=np.int64)
        for tok, c in cnt.items():
            for row in range(d):
                slots[row * w + _bucket(row, tok, w)] += c
        nz = np.flatnonzero(slots)
        return pa.table(
            {
                "slot": pa.array(nz, pa.int64()),
                "cnt": pa.array(slots[nz], pa.int64()),
            }
        )

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("slot")
        .sum("cnt")
        .to_pandas()
    )
    cms = np.zeros((d, w), dtype=np.int64)
    flat = cms.reshape(-1)
    flat[merged["slot"].to_numpy()] = merged["sum(cnt)"].to_numpy()
    return cms


def cms_heavy_hitters(
    ds,
    text_col: str = "text",
    d: int = 4,
    w: int = 32,
    denom: int = 200,
):
    """Tokens whose CMS estimate >= total_tokens // denom.

    Returns a Dataset of (tk, cnt, est): the exact count (from the
    distinct-token groupby, for verification) and the sketch estimate
    (>= cnt by CMS's one-sided error). Filtering is on ``est`` — the
    sketch-only decision a real pipeline would make.
    """
    import ray
    import ray.data as _rd  # noqa: F401  (keeps `ray` module-scoped)

    cms = cms_build(ds, text_col=text_col, d=d, w=w)
    total = int(cms[0].sum())
    thresh = total // denom
    cms_ref = ray.put(cms)

    def tok_partial(b: pa.Table) -> pa.Table:
        cnt: Counter = Counter()
        for t in b.column(text_col).to_pylist():
            cnt.update(t.split(" "))
        return pa.table(
            {
                "tk": pa.array(list(cnt.keys()), pa.string()),
                "cnt": pa.array(list(cnt.values()), pa.int64()),
            }
        )

    def estimate(b: pa.Table) -> pa.Table:
        sk = ray.get(cms_ref)
        toks = b.column("tk").to_pylist()
        est = np.empty(len(toks), dtype=np.int64)
        for i, tok in enumerate(toks):
            est[i] = min(sk[row, _bucket(row, tok, w)] for row in range(d))
        t = pa.table(
            {
                "tk": b.column("tk"),
                "cnt": b.column("sum(cnt)").cast(pa.int64()),
                "est": pa.array(est, pa.int64()),
            }
        )
        return t.filter(pa.compute.greater_equal(t.column("est"), thresh))

    tokens = (
        ds.map_batches(tok_partial, batch_format="pyarrow")
        .groupby("tk")
        .sum("cnt")
    )
    return tokens.map_batches(estimate, batch_format="pyarrow")
