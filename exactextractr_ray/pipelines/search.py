"""Hybrid retrieval: BM25 candidate generation + embedding rerank with
pseudo-relevance feedback — the standard two-stage search stack, composed
from the repo's own operators.

Stage 1 (lexical): ``bm25_topk`` returns the top-k candidates (rational
idf, bit-exact — stages/text.py).

Stage 2 (semantic): the centroid of the top-3 BM25 hits' embeddings is the
pseudo-relevance-feedback "query vector" (no query embedding model exists
in this environment — PRF is the classical substitute); candidates rerank
by cosine to that centroid.

Bit-exactness contract: every float reduction over the embedding dims is a
STRICT left fold (``np.cumsum(...)[-1]`` == DuckDB
``list_reduce(list(x ORDER BY dim), (a,b) -> a+b)`` — the established
bigram_coherence trick), the centroid is ``((e1 + e2) + e3) / 3.0``
elementwise in BM25 rank order, and cosine is
``dot / (sqrt(|e|) * sqrt(|c|))`` — all plain IEEE ops mirrored in the
oracle.

Scale shape: BM25 is the existing two-pass (tiny df aggregate + partial
top-k); the rerank broadcasts ONE d-dim centroid and a k-entry score map,
filters the embedding table to the k candidate ids at the read, and
scores per batch — no shuffle at all after the BM25 finalize.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data


def hybrid_search(
    sf_dir: str,
    terms: list[str],
    k: int = 20,
    feedback: int = 3,
):
    """Returns (doc_id, bm25, cosine) for the BM25 top-k candidates THAT
    HAVE an embedding row, reranked by cosine to the PRF centroid of the
    first ``feedback`` embedded candidates (in BM25 rank order); ordered
    by (cosine DESC, doc_id). Candidates without embeddings cannot be
    semantically reranked and are dropped — the same semantics as the
    oracle's inner JOIN against the embedding table. Empty result if no
    candidate has an embedding."""
    from exactextractr_ray.stages.text import bm25_topk

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    cand = bm25_topk(docs, terms, k=k).to_pandas()
    cand = cand.sort_values(
        ["score", "doc_id"], ascending=[False, True]
    ).reset_index(drop=True)
    top_ids = cand["doc_id"].to_numpy(np.int64)

    def _id_filter(ids_arr):
        ids_sorted = np.sort(np.asarray(ids_arr, dtype=np.int64))

        def f(b: pa.Table) -> pa.Table:
            v = b.column("vec_id").to_numpy().astype(np.int64)
            return b.filter(pa.array(np.isin(v, ids_sorted)))

        return f

    embp = (
        ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        .map_batches(_id_filter(top_ids), batch_format="pyarrow")
        .to_pandas()
    )
    # Ray to_pandas drops columns when every block is empty (repo-wide
    # gotcha) — treat that as "no candidate has an embedding"
    if "vec_id" not in embp.columns or len(embp) == 0:
        embp = pd.DataFrame(
            {"vec_id": pd.Series([], dtype=np.int64), "embedding": []}
        )
    embf = embp.set_index("vec_id")
    present = [int(i) for i in top_ids if int(i) in embf.index]
    empty = pd.DataFrame(
        {
            "doc_id": pd.Series([], dtype=np.int64),
            "bm25": pd.Series([], dtype=np.float64),
            "cosine": pd.Series([], dtype=np.float64),
        }
    )
    if not present:
        return empty
    fb_ids = present[:feedback]
    # centroid = ((e1 + e2) + e3) / n_fb in BM25 rank order (left fold)
    acc = np.asarray(embf.loc[fb_ids[0], "embedding"], dtype=np.float64)
    for i in fb_ids[1:]:
        acc = acc + np.asarray(embf.loc[i, "embedding"], dtype=np.float64)
    cent = acc / np.float64(len(fb_ids))
    nc = np.sqrt(np.cumsum(cent * cent)[-1])
    score_map = dict(zip(cand["doc_id"].astype(int), cand["score"]))
    bref = ray.put((cent, nc, score_map))

    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).map_batches(_id_filter(present), batch_format="pyarrow")

    def rerank(b: pa.Table) -> pa.Table:
        c, ncn, smap = ray.get(bref)
        ids = b.column("vec_id").to_numpy().astype(np.int64)
        if len(ids) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "bm25": pa.array([], pa.float64()),
                    "cosine": pa.array([], pa.float64()),
                }
            )
        em = np.stack(b.column("embedding").to_numpy(zero_copy_only=False)).astype(
            np.float64
        )
        # strict left folds per row (cumsum along dims)
        dots = np.cumsum(em * c[None, :], axis=1)[:, -1]
        ne = np.sqrt(np.cumsum(em * em, axis=1)[:, -1])
        cos = dots / (ne * ncn)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "bm25": pa.array(
                    np.array([smap[int(i)] for i in ids]), pa.float64()
                ),
                "cosine": pa.array(cos, pa.float64()),
            }
        )

    out = emb.map_batches(rerank, batch_format="pyarrow").to_pandas()
    return out.sort_values(
        ["cosine", "doc_id"], ascending=[False, True]
    ).reset_index(drop=True)
