"""Unigram language-model tokenizer — distributed training + Viterbi
encoding (the SentencePiece family: Kudo 2018, "Subword Regularization",
arXiv:1804.10959).

Completes the tokenizer trio next to stages/bpe.py (frequency merges)
and stages/wordpiece.py (likelihood merges): Unigram goes the other way —
START from a large seed vocabulary of substrings and PRUNE it down,
re-estimating piece probabilities between prunes. This module implements
the deterministic HARD-EM (Viterbi-EM) variant: the E-step counts pieces
along each word's single best segmentation instead of full
forward-backward expectations. Hard EM is the standard deterministic
simplification of Kudo's soft EM, and it makes every aggregate an
INTEGER sum — order-independent, so the distributed trainer is
bit-identical to the single-process reference at any parallelism (the
same argument as bpe/wordpiece; soft-EM float expectations would not
survive a groupby-sum order change).

Deterministic contract (identical in trainer and reference):
* seed = all word substrings up to ``max_piece_len`` scored by
  occurrence-count x word-frequency, top ``seed_size`` by
  (count DESC, piece ASC), UNION all single characters (coverage);
* each round: Viterbi E-step (ties: higher log-prob sum, then FEWER
  pieces, then lexicographically smaller piece at the earliest
  difference — realized by the DP tie-break below), integer count
  aggregation, M-step logp = log(cnt) - log(total) with count-0 pieces
  dropped; then prune the lowest ``shrink`` fraction by
  (count ASC, piece DESC) — never single characters — until
  ``vocab_size`` remains;
* encoding = the same Viterbi over the final vocabulary, [UNK] for
  uncoverable characters.

100-TB shape: the corpus is read EXACTLY ONCE into the zipf-bounded
distinct-word table (stages/bpe.word_counts). Seeding and every E-step
are ``map_batches`` over that table with the CURRENT VOCAB BROADCAST
(piece->logp, bounded by seed_size), followed by a vocab-sized
groupby-sum; only piece-count rows ever shuffle. The driver holds one
vocab-sized table per round — never corpus data.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from .bpe import word_counts

UNK = "[UNK]"


def _viterbi_segment(
    word: str, logp: dict, max_len: int
) -> list[str] | None:
    """Best segmentation of ``word`` under the unigram model.

    DP over end positions; tie-break at equal score: fewer pieces, then
    the lexicographically smaller LAST piece (applied at every prefix,
    this yields the lexicographically smallest piece sequence among
    score-and-length ties). Returns None when some character is not
    coverable (caller substitutes [UNK])."""
    n = len(word)
    NEG = -math.inf
    best = [NEG] * (n + 1)
    cnt = [0] * (n + 1)
    back: list[tuple[int, str] | None] = [None] * (n + 1)
    best[0] = 0.0
    for e in range(1, n + 1):
        for s in range(max(0, e - max_len), e):
            if best[s] == NEG:
                continue
            piece = word[s:e]
            lp = logp.get(piece)
            if lp is None:
                continue
            sc = best[s] + lp
            c = cnt[s] + 1
            if (
                sc > best[e]
                or (sc == best[e] and c < cnt[e])
                or (sc == best[e] and c == cnt[e] and back[e] is not None
                    and piece < back[e][1])
            ):
                best[e] = sc
                cnt[e] = c
                back[e] = (s, piece)
    if best[n] == NEG:
        return None
    out: list[str] = []
    e = n
    while e > 0:
        s, piece = back[e]  # type: ignore[misc]
        out.append(piece)
        e = s
    out.reverse()
    return out


def _seed_partial(b: pa.Table, max_piece_len: int) -> pa.Table:
    """Per-batch substring-count partials over the word table:
    count(piece) = sum over words of occurrences(piece in word) * cnt."""
    from collections import Counter

    words = b.column("word").to_pylist()
    cnts = b.column("cnt").to_numpy()
    acc: Counter = Counter()
    for w, c in zip(words, cnts):
        n = len(w)
        for s in range(n):
            for e in range(s + 1, min(n, s + max_piece_len) + 1):
                acc[w[s:e]] += int(c)
    if not acc:
        return pa.table({"piece": pa.array([], pa.string()),
                         "cnt": pa.array([], pa.int64())})
    return pa.table(
        {
            "piece": pa.array(list(acc.keys()), pa.string()),
            "cnt": pa.array(list(acc.values()), pa.int64()),
        }
    )


def _estep_partial(b: pa.Table, vocab_ref, max_piece_len: int) -> pa.Table:
    """Viterbi E-step over a word-table batch with the broadcast vocab:
    integer piece counts along each word's best segmentation x word
    frequency."""
    from collections import Counter

    logp = ray.get(vocab_ref) if not isinstance(vocab_ref, dict) else vocab_ref
    words = b.column("word").to_pylist()
    cnts = b.column("cnt").to_numpy()
    acc: Counter = Counter()
    for w, c in zip(words, cnts):
        seg = _viterbi_segment(w, logp, max_piece_len)
        if seg is None:
            continue
        for piece in seg:
            acc[piece] += int(c)
    if not acc:
        return pa.table({"piece": pa.array([], pa.string()),
                         "cnt": pa.array([], pa.int64())})
    return pa.table(
        {
            "piece": pa.array(list(acc.keys()), pa.string()),
            "cnt": pa.array(list(acc.values()), pa.int64()),
        }
    )


def _mstep(counts: pd.DataFrame) -> dict:
    """Integer counts -> logp dict; zero-count pieces drop out."""
    total = float(counts["cnt"].sum())
    return {
        p: math.log(float(c)) - math.log(total)
        for p, c in zip(counts["piece"], counts["cnt"])
        if c > 0
    }


def _prune(counts: pd.DataFrame, shrink: float, vocab_size: int) -> pd.DataFrame:
    """Drop the lowest ``shrink`` fraction by (cnt ASC, piece DESC),
    never single characters, never below vocab_size."""
    singles = counts[counts["piece"].str.len() == 1]
    multi = counts[counts["piece"].str.len() > 1].sort_values(
        ["cnt", "piece"], ascending=[True, False]
    )
    n_target = max(vocab_size - len(singles), 0)
    n_drop = min(
        int(len(multi) * shrink),
        max(len(multi) - n_target, 0),
    )
    kept = multi.iloc[n_drop:]
    return pd.concat([singles, kept], ignore_index=True)


def unigram_train(
    ds,
    vocab_size: int = 64,
    text_col: str = "text",
    seed_size: int = 512,
    max_piece_len: int = 8,
    em_iters: int = 2,
    shrink: float = 0.2,
    max_rounds: int = 16,
) -> pd.DataFrame:
    """Distributed Unigram-LM training -> (piece, cnt, logp) table sorted
    by (cnt DESC, piece ASC), len <= vocab_size + #single-chars slack.

    Corpus read once (word_counts); seeding and E-steps are map_batches
    over the materialized distinct-word table with the current vocab
    broadcast via ``ray.put``; counts aggregate by a vocab-sized
    groupby-sum. Bit-identical to ``unigram_train_reference``."""
    wc = word_counts(ds, text_col).materialize()

    # ---- seed ----
    seeds = (
        wc.map_batches(
            _seed_partial, batch_format="pyarrow",
            fn_kwargs={"max_piece_len": max_piece_len},
        )
        .groupby("piece")
        .sum("cnt")
        .map_batches(
            lambda b: b.rename_columns(["piece", "cnt"]),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    singles = seeds[seeds["piece"].str.len() == 1]
    multi = seeds[seeds["piece"].str.len() > 1].sort_values(
        ["cnt", "piece"], ascending=[False, True]
    ).head(max(seed_size - len(singles), 0))
    vocab_df = pd.concat([singles, multi], ignore_index=True)

    def em(vdf: pd.DataFrame) -> pd.DataFrame:
        cur = _mstep(vdf)
        for _ in range(em_iters):
            ref = ray.put(cur)
            counts = (
                wc.map_batches(
                    _estep_partial, batch_format="pyarrow",
                    fn_kwargs={"vocab_ref": ref,
                               "max_piece_len": max_piece_len},
                )
                .groupby("piece")
                .sum("cnt")
                .map_batches(
                    lambda b: b.rename_columns(["piece", "cnt"]),
                    batch_format="pyarrow",
                )
                .to_pandas()
            )
            # keep zero-count single chars (coverage floor, cnt 0 -> kept
            # with the smallest representable weight next round is wrong;
            # instead retain them with cnt 0 rows for pruning bookkeeping
            # but exclude from the model (dropped by _mstep)
            have = set(counts["piece"])
            miss = [p for p in vdf["piece"]
                    if len(p) == 1 and p not in have]
            if miss:
                counts = pd.concat(
                    [counts, pd.DataFrame({"piece": miss,
                                           "cnt": [0] * len(miss)})],
                    ignore_index=True,
                )
            cur = _mstep(counts)
            vdf = counts
        return vdf

    rounds = 0
    vocab_df = em(vocab_df)
    while rounds < max_rounds:
        n_now = len(vocab_df)
        if n_now <= vocab_size:
            break
        vocab_df = _prune(vocab_df, shrink, vocab_size)
        vocab_df = em(vocab_df)
        rounds += 1
        if len(vocab_df) == n_now:
            break
    out = vocab_df[vocab_df["cnt"] > 0].copy()
    total = float(out["cnt"].sum())
    out["logp"] = np.log(out["cnt"].astype(np.float64)) - math.log(total)
    out = out.sort_values(["cnt", "piece"],
                          ascending=[False, True]).reset_index(drop=True)
    return out[["piece", "cnt", "logp"]].astype({"cnt": np.int64})


def unigram_train_reference(
    wc: dict,
    vocab_size: int = 64,
    seed_size: int = 512,
    max_piece_len: int = 8,
    em_iters: int = 2,
    shrink: float = 0.2,
    max_rounds: int = 16,
) -> pd.DataFrame:
    """Single-process trainer over a word->count dict, sharing only the
    tiny pure helpers (_viterbi_segment/_mstep/_prune) with the
    distributed path — the correctness oracle."""
    from collections import Counter

    acc: Counter = Counter()
    for w, c in wc.items():
        n = len(w)
        for s in range(n):
            for e in range(s + 1, min(n, s + max_piece_len) + 1):
                acc[w[s:e]] += int(c)
    seeds = pd.DataFrame(
        {"piece": list(acc.keys()), "cnt": list(acc.values())}
    )
    singles = seeds[seeds["piece"].str.len() == 1]
    multi = seeds[seeds["piece"].str.len() > 1].sort_values(
        ["cnt", "piece"], ascending=[False, True]
    ).head(max(seed_size - len(singles), 0))
    vdf = pd.concat([singles, multi], ignore_index=True)

    def estep(cur: dict) -> pd.DataFrame:
        cc: Counter = Counter()
        for w, c in wc.items():
            seg = _viterbi_segment(w, cur, max_piece_len)
            if seg is None:
                continue
            for piece in seg:
                cc[piece] += int(c)
        return pd.DataFrame(
            {"piece": list(cc.keys()), "cnt": list(cc.values())}
        )

    def em(vdf: pd.DataFrame) -> pd.DataFrame:
        cur = _mstep(vdf)
        for _ in range(em_iters):
            counts = estep(cur)
            have = set(counts["piece"])
            miss = [p for p in vdf["piece"]
                    if len(p) == 1 and p not in have]
            if miss:
                counts = pd.concat(
                    [counts, pd.DataFrame({"piece": miss,
                                           "cnt": [0] * len(miss)})],
                    ignore_index=True,
                )
            cur = _mstep(counts)
            vdf = counts
        return vdf

    rounds = 0
    vdf = em(vdf)
    while rounds < max_rounds:
        n_now = len(vdf)
        if n_now <= vocab_size:
            break
        vdf = _prune(vdf, shrink, vocab_size)
        vdf = em(vdf)
        rounds += 1
        if len(vdf) == n_now:
            break
    out = vdf[vdf["cnt"] > 0].copy()
    total = float(out["cnt"].sum())
    out["logp"] = np.log(out["cnt"].astype(np.float64)) - math.log(total)
    out = out.sort_values(["cnt", "piece"],
                          ascending=[False, True]).reset_index(drop=True)
    return out[["piece", "cnt", "logp"]].astype({"cnt": np.int64})


def unigram_encode_batch(
    b: pa.Table, vocab_ref, max_piece_len: int,
    id_col: str = "doc_id", text_col: str = "text",
) -> pa.Table:
    """map_batches fn: Viterbi-encode each document with the broadcast
    final vocabulary -> (doc_id, n_tokens, n_unk, tokens_concat)."""
    logp = ray.get(vocab_ref) if not isinstance(vocab_ref, dict) else vocab_ref
    ids = b.column(id_col).to_numpy()
    texts = b.column(text_col).to_pylist()
    n_tok, n_unk, concat = [], [], []
    for t in texts:
        toks: list[str] = []
        unk = 0
        for w in (t or "").split():
            seg = _viterbi_segment(w, logp, max_piece_len)
            if seg is None:
                toks.append(UNK)
                unk += 1
            else:
                toks.extend(seg)
        n_tok.append(len(toks))
        n_unk.append(unk)
        concat.append(" ".join(toks))
    return pa.table(
        {
            "doc_id": pa.array(ids.astype(np.int64), pa.int64()),
            "n_tokens": pa.array(n_tok, pa.int64()),
            "n_unk": pa.array(n_unk, pa.int64()),
            "tokens_concat": pa.array(concat, pa.string()),
        }
    )


def unigram_encode(ds, vocab: pd.DataFrame, max_piece_len: int = 8,
                   id_col: str = "doc_id", text_col: str = "text"):
    """Encode a document Dataset with a trained vocab table."""
    logp = dict(zip(vocab["piece"], vocab["logp"]))
    ref = ray.put(logp)
    return ds.map_batches(
        unigram_encode_batch, batch_format="pyarrow",
        fn_kwargs={"vocab_ref": ref, "max_piece_len": max_piece_len,
                   "id_col": id_col, "text_col": text_col},
    )
