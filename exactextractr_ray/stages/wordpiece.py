"""WordPiece tokenizer — distributed likelihood-scored training and
greedy longest-match-first encoding (the BERT tokenizer family).

Complements stages/bpe.py: BPE merges the most FREQUENT pair each
round; WordPiece merges the pair maximizing the likelihood score
``count(ab) / (count(a) * count(b))`` (Schuster & Nakajima 2012, the
public BERT/HuggingFace convention), and its encoder is not
merge-replay but greedy longest-prefix matching with ``##``
continuation pieces and an ``[UNK]`` fallback.

100-TB shape (same as bpe_train): corpus text is read EXACTLY ONCE
into the bounded word-frequency table; every training round runs
pair-count partials -> groupby-sum -> per-block arg-best -> one tiny
row per block to the driver. Symbol counts (the score denominator) are
a bounded aggregate over the same vocab table, collected once per
round (#distinct symbols <= alphabet + merges). Scoring uses float64
``cnt / (ca * cb)`` with the (score DESC, left ASC, right ASC)
tie-break in BOTH the distributed trainer and the single-process
reference, so results are deterministic at any parallelism and
bit-comparable between the two.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
import pyarrow as pa

from .bpe import word_counts

logger = logging.getLogger(__name__)

CONT = "##"
UNK = "[UNK]"


def _to_wp_symbol_rows(b: pa.Table) -> pa.Table:
    """word -> WordPiece symbol sequence: first char plain, rest with
    the ## continuation prefix (space-joined symbols column)."""
    words = b.column("word").to_pylist()
    cnts = b.column("cnt").to_numpy()
    syms = [
        " ".join([w[0]] + [CONT + c for c in w[1:]]) if w else ""
        for w in words
    ]
    return pa.table(
        {
            "word": pa.array(words, pa.string()),
            "syms": pa.array(syms, pa.string()),
            "cnt": pa.array(cnts.astype(np.int64), pa.int64()),
        }
    )


def _wp_pair_partial(b: pa.Table) -> pa.Table:
    """Per-batch (left, right) pair counts plus per-symbol counts
    (kind=0 pair rows, kind=1 symbol rows with right='')."""
    from collections import Counter

    pairs: Counter = Counter()
    symbols: Counter = Counter()
    for syms, cnt in zip(b.column("syms").to_pylist(),
                         b.column("cnt").to_numpy()):
        parts = syms.split(" ") if syms else []
        c = int(cnt)
        for s in parts:
            symbols[s] += c
        for i in range(len(parts) - 1):
            pairs[(parts[i], parts[i + 1])] += c
    l_, r_, c_, k_ = [], [], [], []
    for (a, bb), c in pairs.items():
        l_.append(a)
        r_.append(bb)
        c_.append(c)
        k_.append(0)
    for s, c in symbols.items():
        l_.append(s)
        r_.append("")
        c_.append(c)
        k_.append(1)
    return pa.table(
        {
            "left": pa.array(l_, pa.string()),
            "right": pa.array(r_, pa.string()),
            "cnt": pa.array(c_, pa.int64()),
            "kind": pa.array(k_, pa.int64()),
        }
    )


def _merge_piece(left: str, right: str) -> str:
    return left + (right[len(CONT):] if right.startswith(CONT) else right)


def _wp_apply_merge(b: pa.Table, left: str, right: str) -> pa.Table:
    merged = _merge_piece(left, right)
    out = []
    for syms in b.column("syms").to_pylist():
        parts = syms.split(" ") if syms else []
        res, i = [], 0
        while i < len(parts):
            if (i + 1 < len(parts) and parts[i] == left
                    and parts[i + 1] == right):
                res.append(merged)
                i += 2
            else:
                res.append(parts[i])
                i += 1
        out.append(" ".join(res))
    return pa.table(
        {
            "word": b.column("word"),
            "syms": pa.array(out, pa.string()),
            "cnt": b.column("cnt"),
        }
    )


def _pick_best(pair_df: pd.DataFrame, sym_counts: dict) -> tuple | None:
    """(score DESC, left ASC, right ASC) arg-best over a pair-count
    frame — shared by the distributed trainer (per round, on the
    bounded aggregated pair table) and the reference."""
    if len(pair_df) == 0:
        return None
    ca = pair_df["left"].map(sym_counts).to_numpy(dtype=np.float64)
    cb = pair_df["right"].map(sym_counts).to_numpy(dtype=np.float64)
    score = pair_df["cnt"].to_numpy(np.float64) / (ca * cb)
    order = np.lexsort(
        (
            pair_df["right"].to_numpy(),
            pair_df["left"].to_numpy(),
            -score,
        )
    )
    i = order[0]
    return (
        str(pair_df["left"].iloc[i]),
        str(pair_df["right"].iloc[i]),
        int(pair_df["cnt"].iloc[i]),
        float(score[i]),
    )


def wordpiece_train(
    ds,
    text_col: str = "text",
    num_merges: int = 8,
    min_freq: int = 1,
) -> pd.DataFrame:
    """Learn ``num_merges`` WordPiece merges -> (rank, left, right,
    piece, cnt, score) merge/vocab table. Corpus read once; rounds run
    on the bounded materialized vocab (see module docstring)."""
    import pyarrow.compute as pc

    wc = word_counts(ds, text_col)
    wc = wc.map_batches(
        lambda b: b.filter(pc.greater_equal(b.column("cnt"), min_freq)),
        batch_format="pyarrow",
    )
    words = wc.map_batches(_to_wp_symbol_rows,
                           batch_format="pyarrow").materialize()

    merges: list[dict] = []
    for rank in range(num_merges):
        sums = (
            words.map_batches(_wp_pair_partial, batch_format="pyarrow")
            .groupby(["left", "right", "kind"])
            .sum("cnt")
            .map_batches(
                lambda b: b.rename_columns(
                    ["left", "right", "kind", "cnt"]
                ),
                batch_format="pyarrow",
            )
        )
        # bounded: pairs over the vocab symbol sequences + symbol rows
        agg = sums.to_pandas()
        sym_counts = dict(
            zip(agg[agg["kind"] == 1]["left"], agg[agg["kind"] == 1]["cnt"])
        )
        best = _pick_best(agg[agg["kind"] == 0], sym_counts)
        if best is None:
            break
        left, right, cnt, score = best
        merges.append(
            {
                "rank": rank,
                "left": left,
                "right": right,
                "piece": _merge_piece(left, right),
                "cnt": cnt,
                "score": score,
            }
        )
        words = words.map_batches(
            _wp_apply_merge,
            batch_format="pyarrow",
            fn_kwargs={"left": left, "right": right},
        ).materialize()
    return pd.DataFrame(
        merges, columns=["rank", "left", "right", "piece", "cnt", "score"]
    ).astype({"rank": np.int64, "cnt": np.int64}, errors="ignore")


def wordpiece_train_reference(
    texts: list[str], num_merges: int = 8, min_freq: int = 1
) -> pd.DataFrame:
    """Single-process reference (same scoring/tie-break) for testing the
    distributed trainer."""
    from collections import Counter

    wc = Counter()
    for t in texts:
        if t:
            wc.update(t.split())
    vocab = {w: c for w, c in wc.items() if c >= min_freq}
    words = {
        w: [w[0]] + [CONT + c for c in w[1:]] for w in vocab if w
    }
    merges = []
    for rank in range(num_merges):
        pairs: Counter = Counter()
        symbols: Counter = Counter()
        for w, syms in words.items():
            c = vocab[w]
            for s in syms:
                symbols[s] += c
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        pair_df = pd.DataFrame(
            [(a, b, c) for (a, b), c in pairs.items()],
            columns=["left", "right", "cnt"],
        )
        best = _pick_best(pair_df, dict(symbols))
        left, right, cnt, score = best
        piece = _merge_piece(left, right)
        merges.append(
            {"rank": rank, "left": left, "right": right, "piece": piece,
             "cnt": cnt, "score": score}
        )
        for w, syms in words.items():
            res, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == left
                        and syms[i + 1] == right):
                    res.append(piece)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            words[w] = res
    return pd.DataFrame(
        merges, columns=["rank", "left", "right", "piece", "cnt", "score"]
    ).astype({"rank": np.int64, "cnt": np.int64}, errors="ignore")


def wordpiece_encode_word(word: str, vocab: set) -> list[str]:
    """Greedy longest-match-first (BERT WordPieceTokenizer semantics):
    longest vocab prefix, then longest ##-continuation pieces; a word
    with any unmatchable span becomes a single [UNK]."""
    out = []
    i = 0
    n = len(word)
    while i < n:
        end = n
        piece = None
        while end > i:
            sub = word[i:end]
            if i > 0:
                sub = CONT + sub
            if sub in vocab:
                piece = sub
                break
            end -= 1
        if piece is None:
            return [UNK]
        out.append(piece)
        i = end
    return out


def wordpiece_encode_batch(
    batch: pa.Table, vocab: set, text_col: str = "text"
) -> pa.Table:
    """Tokenize texts with a fixed vocab -> per-doc piece and [UNK]
    counts (vocab broadcast via task closure; per-word memoization)."""
    texts = batch.column(text_col).to_pylist()
    cache: dict[str, tuple[int, int]] = {}

    def counts(word: str) -> tuple[int, int]:
        got = cache.get(word)
        if got is None:
            pieces = wordpiece_encode_word(word, vocab)
            got = (len(pieces), sum(1 for p in pieces if p == UNK))
            cache[word] = got
        return got

    ntok = np.zeros(len(texts), np.int64)
    nunk = np.zeros(len(texts), np.int64)
    for i, t in enumerate(texts):
        for w in (t or "").split():
            a, b = counts(w)
            ntok[i] += a
            nunk[i] += b
    res = batch.select([c for c in batch.column_names if c != text_col])
    res = res.append_column("wp_tokens", pa.array(ntok, pa.int64()))
    return res.append_column("wp_unks", pa.array(nunk, pa.int64()))


def wordpiece_vocab(merge_df: pd.DataFrame, texts_sample=None) -> set:
    """Vocabulary = every single-char piece seen in the merge table's
    alphabet plus all merged pieces. When ``texts_sample`` (an iterable
    of words) is given, its alphabet seeds the vocab as BERT's trainer
    does with the full corpus alphabet."""
    vocab: set = set()
    if texts_sample is not None:
        for w in texts_sample:
            for j, c in enumerate(w):
                vocab.add(c if j == 0 else CONT + c)
    for _, row in merge_df.iterrows():
        vocab.add(row["left"])
        vocab.add(row["right"])
        vocab.add(row["piece"])
    return vocab
