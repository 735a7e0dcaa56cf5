"""Flagship web-corpus curation pipeline: the end-to-end composition a
training-data pipeline actually runs, built entirely from this repo's
oracled stages.

    documents
      -> language ID            (stopword voting, stages/text.py)
      -> Gopher repetition gates(top-word / dup-2-gram fractions)
      -> exact dedup            (md5 groupby, min-doc_id keeper)
      -> near-dup pruning       (exact n-gram Jaccard pairs ->
                                 connected-components clusters ->
                                 only cluster keepers survive)

Scale shape (the 100 TB design point): every per-doc stage is one
``map_batches`` over the streaming corpus; the exact-dedup keeper check is
a distributed hash join on (content_hash, min doc_id) — document text
shuffles exactly once for the n-gram inverted index, hashes otherwise; the
only object-store checkpoint is the NARROW per-doc metadata projection
(text never materializes — the deterministic lineage streams once per
consumer instead); the near-dup drop set is pair-bounded (orders of
magnitude smaller than the corpus) and broadcast once via ``ray.put``. Each stage alone is bit-exact
against SQL, and so is the whole composition (the `curate_corpus` oracle
chains the same CTEs).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def curate_corpus(
    docs,
    lang: str = "en",
    jaccard_threshold: float = 0.35,
    top_word_max: float = 0.3,
    dup_2gram_max: float = 0.2,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Returns a Dataset of kept documents:
    (doc_id, pred_lang, n_words, quality_score), sorted by the caller."""
    import ray

    from ..stages.dedup import (
        content_hash_batch,
        dup_clusters,
        ngram_jaccard_pairs,
    )
    from ..stages.text import (
        langid_batch,
        quality_batch,
        repetition_stats_batch,
    )

    def annotate(batch: pa.Table) -> pa.Table:
        out = langid_batch(batch, text_col=text_col)
        out = quality_batch(out, text_col=text_col)
        rep = repetition_stats_batch(batch, id_col=id_col, text_col=text_col)
        for name in ("n_words", "top_word_frac", "dup_2gram_frac"):
            out = out.append_column(name, rep.column(name))
        keep = pc.and_(
            pc.equal(out.column("pred_lang"), lang),
            pc.and_(
                pc.less_equal(out.column("top_word_frac"), top_word_max),
                pc.less_equal(out.column("dup_2gram_frac"), dup_2gram_max),
            ),
        )
        out = out.filter(keep)
        return content_hash_batch(out, text_col=text_col).select(
            [
                id_col,
                text_col,
                "content_hash",
                "pred_lang",
                "n_words",
                "quality_score",
            ]
        )

    surv = docs.map_batches(annotate, batch_format="pyarrow")

    # exact dedup: distributed (hash -> min doc_id) keeper table, hash-joined
    # back — only doc_id survives the comparison, text never re-shuffles here
    keepers = surv.select_columns(["content_hash", id_col]).groupby(
        "content_hash"
    ).min(id_col)
    keepers = keepers.map_batches(
        lambda t: t.rename_columns(["content_hash", "__keeper"]),
        batch_format="pyarrow",
    )
    ncpu = max(8, int(ray.cluster_resources().get("CPU", 8)))
    joined = surv.join(
        keepers, join_type="inner", num_partitions=ncpu, on=("content_hash",)
    )
    kept1 = joined.map_batches(
        lambda t: t.filter(
            pc.equal(t.column(id_col), t.column("__keeper"))
        ).drop_columns(["__keeper", "content_hash"]),
        batch_format="pyarrow",
    )

    # kept1 has two consumers (pair mining needs text; the final filter only
    # needs metadata). Checkpoint ONLY the narrow metadata projection — the
    # corpus text never enters the object store; the deterministic
    # annotate->join lineage simply executes once per consumer instead
    # (one extra streaming pass beats a corpus-sized checkpoint at scale).
    kept_meta = kept1.select_columns(
        [id_col, "pred_lang", "n_words", "quality_score"]
    ).materialize()

    # near-dup pruning: transitive clusters over the exact Jaccard pair list;
    # non-keepers (cluster_id != doc_id) form a PAIR-BOUNDED drop set
    pairs = ngram_jaccard_pairs(
        kept1, threshold=jaccard_threshold, id_col=id_col, text_col=text_col
    )
    clusters = dup_clusters(pairs)
    drop = set()
    for b in clusters.iter_batches(batch_format="pyarrow"):
        ids = b.column("doc_id").to_numpy()
        cl = b.column("cluster_id").to_numpy()
        drop.update(int(i) for i, c in zip(ids, cl) if i != c)
    drop_ref = ray.put(frozenset(drop))

    def final_filter(batch: pa.Table) -> pa.Table:
        d = ray.get(drop_ref)
        mask = pa.array(
            [int(i) not in d for i in batch.column(id_col).to_numpy()],
            pa.bool_(),
        )
        return batch.filter(mask)

    return kept_meta.map_batches(final_filter, batch_format="pyarrow")
