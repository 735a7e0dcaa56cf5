"""Hashed bag-of-words linear classification + blocklist gating — the two
classifier-shaped filters of the published web-corpus pipelines:

* **blocklist gate** (C4, Raffel et al. 2020 §2.2: drop any page containing
  a word from a blocklist): exact whole-token matching, vectorized with one
  ``np.isin`` over the batch's concatenated token stream.
* **linear quality classifier inference** (the GPT-3 / LLaMA "quality
  classifier" step: score every document with a pretrained linear model
  over hashed bag-of-words features, fastText's architecture): weights are
  a dense (n_classes, n_buckets) matrix BROADCAST once per actor (built in
  ``__init__`` — the model-inference actor-pool pattern), scoring is one
  vectorized gather+segment-sum per batch, prediction is argmax with a
  deterministic smallest-class tie rule.

Determinism / oracle: this environment has no pretrained checkpoints, so
the demo weight matrix is derived from md5 — ``w[c, b] = (md5int(f"{c}:{b}")
% 2001) - 1000`` — which DuckDB replays exactly; token buckets use the
repo-standard ``md5(token)[:8] % n_buckets`` recipe (stages/dsir.py,
stages/text.py). Scores are exact int64 sums, so the oracle is bit-exact.
A real deployment swaps ``_demo_weights`` for a trained matrix shipped via
``ray.put`` — nothing else changes.

Scale shape (100 TB): pure ``map_batches`` over an actor pool, ZERO
shuffle; the weight matrix is per-actor state (n_classes x n_buckets ints,
KBs), text never leaves the reading stage, output is one row per doc.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def _md5_bucket(tokens: list[str], n_buckets: int) -> np.ndarray:
    return np.fromiter(
        (
            int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % n_buckets
            for t in tokens
        ),
        dtype=np.int64,
        count=len(tokens),
    )


def _demo_weights(n_classes: int, n_buckets: int) -> np.ndarray:
    """Deterministic stand-in weight matrix (see module docstring)."""
    w = np.empty((n_classes, n_buckets), dtype=np.int64)
    for c in range(n_classes):
        for b in range(n_buckets):
            h = int(hashlib.md5(f"{c}:{b}".encode()).hexdigest()[:8], 16)
            w[c, b] = h % 2001 - 1000
    return w


class HashedLinearClassifier:
    """Actor stage: documents -> (doc_id, pred_class, score).

    ``__init__`` holds the model (once per actor); ``__call__`` scores a
    batch with one token->bucket pass and an (n_classes, n_tokens) gather
    summed per document — no per-token Python in the scoring loop."""

    def __init__(self, n_classes: int = 4, n_buckets: int = 512,
                 weights: np.ndarray | None = None,
                 id_col: str = "doc_id", text_col: str = "text"):
        self.w = (
            np.asarray(weights, np.int64)
            if weights is not None
            else _demo_weights(n_classes, n_buckets)
        )
        self.n_classes, self.n_buckets = self.w.shape
        self.id_col, self.text_col = id_col, text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_numpy().astype(np.int64)
        texts = batch.column(self.text_col).to_pylist()
        toks_per_doc = [
            [x for x in (t or "").split(" ") if x] for t in texts
        ]
        lens = np.array([len(t) for t in toks_per_doc], dtype=np.int64)
        # token-less docs score nothing (the SQL oracle's unnest emits no
        # rows for them) — drop on both sides
        nonempty = lens > 0
        ids, lens = ids[nonempty], lens[nonempty]
        toks_per_doc = [t for t in toks_per_doc if t]
        flat = [x for toks in toks_per_doc for x in toks]
        buckets = _md5_bucket(flat, self.n_buckets)
        owner = np.repeat(np.arange(len(ids)), lens)
        # per-class segment sums: gather w[c, bucket] then bincount by doc
        scores = np.zeros((self.n_classes, len(ids)), dtype=np.int64)
        for c in range(self.n_classes):
            scores[c] = np.bincount(
                owner, weights=self.w[c, buckets], minlength=len(ids)
            ).astype(np.int64)
        pred = np.argmax(scores, axis=0)  # ties -> smallest class (argmax rule)
        best = scores[pred, np.arange(len(ids))]
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "pred_class": pa.array(pred.astype(np.int64), pa.int64()),
                "score": pa.array(best, pa.int64()),
            }
        )


def classify_documents(ds, n_classes: int = 4, n_buckets: int = 512,
                       concurrency=(1, 8)):
    """Linear-classifier inference over a document Dataset (actor pool)."""
    return ds.map_batches(
        HashedLinearClassifier,
        fn_constructor_kwargs={
            "n_classes": n_classes, "n_buckets": n_buckets,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def classify_sql(n_classes: int = 4, n_buckets: int = 512,
                 from_rel: str = "documents") -> str:
    """DuckDB twin: same bucket recipe, same md5 weight expression, same
    argmax tie rule (score DESC, class ASC)."""
    return f"""ctok AS (
      SELECT doc_id, UNNEST(list_filter(string_split(text, ' '),
                                        x -> x <> '')) AS tok
      FROM {from_rel}),
    cbuck AS (
      SELECT doc_id,
        CAST(CAST(('0x' || substr(md5(tok), 1, 8)) AS UBIGINT)
             % {n_buckets} AS BIGINT) AS b
      FROM ctok),
    cclasses AS (SELECT UNNEST(range({n_classes})) AS c),
    cscore AS (
      SELECT doc_id, c,
        CAST(SUM(CAST(CAST(('0x' || substr(md5(c || ':' || b), 1, 8))
                 AS UBIGINT) % 2001 AS BIGINT) - 1000) AS BIGINT) AS score
      FROM cbuck CROSS JOIN cclasses GROUP BY doc_id, c),
    cbest AS (
      SELECT doc_id, c AS pred_class, score,
        ROW_NUMBER() OVER (PARTITION BY doc_id
                           ORDER BY score DESC, c ASC) AS rn
      FROM cscore)
    SELECT doc_id, pred_class, score FROM cbest WHERE rn = 1"""


def blocklist_batch(batch: pa.Table, terms: tuple,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> pa.Table:
    """C4 blocklist gate: per document, the exact count of whole tokens in
    ``terms`` and the keep flag (0 occurrences). One np.isin over the
    batch's token stream — no per-doc Python matching."""
    ids = batch.column(id_col).to_numpy().astype(np.int64)
    texts = batch.column(text_col).to_pylist()
    toks_per_doc = [[x for x in (t or "").split(" ") if x] for t in texts]
    lens = np.array([len(t) for t in toks_per_doc], dtype=np.int64)
    flat = np.array(
        [x for toks in toks_per_doc for x in toks], dtype=object
    )
    owner = np.repeat(np.arange(len(ids)), lens)
    hit = np.isin(flat, np.array(terms, dtype=object))
    n_blocked = np.bincount(owner[hit], minlength=len(ids)).astype(np.int64)
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "n_blocked": pa.array(n_blocked, pa.int64()),
            "keep": pa.array((n_blocked == 0).astype(np.int64), pa.int64()),
        }
    )


def blocklist_filter(ds, terms: tuple, concurrency=None):
    """Blocklist gate over a document Dataset — shuffle-free."""
    return ds.map_batches(
        blocklist_batch,
        batch_format="pyarrow",
        fn_kwargs={"terms": tuple(terms)},
    )


def blocklist_sql(terms: tuple, from_rel: str = "documents") -> str:
    tlist = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    return f"""SELECT doc_id,
      CAST(len(list_filter(string_split(text, ' '),
               x -> x IN ({tlist}))) AS BIGINT) AS n_blocked,
      CAST(CASE WHEN len(list_filter(string_split(text, ' '),
               x -> x IN ({tlist}))) = 0 THEN 1 ELSE 0 END AS BIGINT)
        AS keep
    FROM {from_rel}"""
