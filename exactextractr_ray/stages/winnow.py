"""Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken, SIGMOD
2003 — the MOSS algorithm): the local document-fingerprinting scheme with
the published guarantee that any shared substring of length >= w + k - 1
is detected, while storing only ~2/(w+1) of the gram hashes.

Relation to neighbors in this repo: ``text.rolling_fingerprint_batch`` keeps
ONE global-min hash per document (whole-doc near-identity signal);
``dedup.substr_dup_spans`` keeps EVERY gram (exact span dedup, heaviest).
Winnowing is the published middle point — a position-bearing fingerprint
SET per document sized for plagiarism / local-overlap detection.

Algorithm (paper §4): hash every k-char gram; slide a window of w
consecutive hashes; in each window select the MINIMUM hash, breaking ties
by the RIGHTMOST position; the fingerprint set is the distinct selected
(position, hash) pairs. Documents with fewer than w grams select nothing
(the guarantee needs one full window).

Scale shape (100 TB): selection is doc-local -> a pure ``map_batches``
stage, ZERO shuffle; the output is the ~2/(w+1)-sized stream downstream
consumers group by fingerprint (the gram-key union-groupby join shape of
substr_dup_spans) — text itself never leaves the reading stage. Hashing is
the batch-vectorized k-pass polynomial of stages/dedup.py (_gram_hashes);
window argmin is one stride-tricks view + reversed argmin per document,
no per-position Python.

Determinism / oracle: the 32-bit polynomial hash is replayed exactly by
DuckDB in sum form (weights B^(k-1-t) mod 2^32 embedded as constants, the
substr_dup_sql recipe), window selection is ROW_NUMBER ordered (h ASC,
p DESC) over a bounded range self-join — bit-exact end to end.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .dedup import _gram_hashes


def winnow_batch(
    batch: pa.Table,
    k: int = 8,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pa.Table:
    """One batch of documents -> selected (doc_id, pos, fp) fingerprints.

    ``pos`` is the 0-based character offset of the selected k-gram; ``fp``
    is its 32-bit polynomial hash (int64 column).
    """
    ids = batch.column(id_col).to_numpy()
    texts = batch.column(text_col).to_pylist()
    owner, pos, h1, _h2 = _gram_hashes(texts, k)
    out_doc: list[np.ndarray] = []
    out_pos: list[np.ndarray] = []
    out_fp: list[np.ndarray] = []
    if owner.size:
        # per-document segments (owner is sorted by construction)
        cuts = np.flatnonzero(np.diff(owner)) + 1
        for seg_pos, seg_h, seg_owner in zip(
            np.split(pos, cuts), np.split(h1, cuts), np.split(owner, cuts)
        ):
            m = seg_h.size
            if m < w:
                continue
            win = np.lib.stride_tricks.sliding_window_view(seg_h, w)
            # rightmost argmin: argmin over the reversed window axis
            j = (w - 1) - np.argmin(win[:, ::-1], axis=1)
            sel = np.unique(np.arange(m - w + 1) + j)
            out_doc.append(np.full(sel.size, ids[seg_owner[0]], np.int64))
            out_pos.append(seg_pos[sel].astype(np.int64))
            out_fp.append(seg_h[sel].astype(np.int64))
    cat = lambda xs: (  # noqa: E731
        np.concatenate(xs) if xs else np.empty(0, np.int64)
    )
    return pa.table(
        {
            "doc_id": pa.array(cat(out_doc), pa.int64()),
            "pos": pa.array(cat(out_pos), pa.int64()),
            "fp": pa.array(cat(out_fp), pa.int64()),
        }
    )


def winnow_fingerprints(ds, k: int = 8, w: int = 4,
                        id_col: str = "doc_id", text_col: str = "text"):
    """Winnowing fingerprints over a document Dataset — shuffle-free."""
    return ds.map_batches(
        winnow_batch,
        batch_format="pyarrow",
        fn_kwargs={"k": k, "w": w, "id_col": id_col, "text_col": text_col},
    )


def winnow_sql(k: int = 8, w: int = 4, from_rel: str = "documents") -> str:
    """DuckDB twin: same hash constants in sum form, same window rule."""
    from .dedup import _M32, _SUBSTR_B1

    offs = ", ".join(
        f"({t}, {pow(_SUBSTR_B1, k - 1 - t, _M32)})" for t in range(k)
    )
    return f"""wdocs AS (SELECT doc_id, text FROM {from_rel}),
    wpos AS (SELECT doc_id, text,
        unnest(generate_series(1, length(text) - {k} + 1)) AS p FROM wdocs),
    woffs(t, w1) AS (VALUES {offs}),
    whashed AS (
      SELECT doc_id, p,
        CAST(SUM(unicode(substr(text, CAST(p + t AS INT), 1)) * w1)
             % {_M32} AS BIGINT) AS h
      FROM wpos, woffs GROUP BY doc_id, p),
    wwins AS (
      SELECT g.doc_id, e.p AS e, g.p AS p, g.h
      FROM whashed e JOIN whashed g
        ON g.doc_id = e.doc_id AND g.p BETWEEN e.p - {w - 1} AND e.p
      WHERE e.p >= {w}),
    wsel AS (
      SELECT doc_id, e, p, h,
        ROW_NUMBER() OVER (PARTITION BY doc_id, e ORDER BY h ASC, p DESC)
          AS rn
      FROM wwins)
    SELECT DISTINCT doc_id, p - 1 AS pos, h AS fp FROM wsel WHERE rn = 1"""
