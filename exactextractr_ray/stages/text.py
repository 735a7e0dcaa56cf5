"""Text-analysis stages for the web-page/document pipeline: frozen HTML->text
extraction, token counting, quality scoring, language ID, fingerprinting.

All are vectorized / per-batch ``map_batches`` transforms. The HTML extractor
is a FROZEN, versioned pure function (EXTRACTOR_VERSION): byte-identical
output per input at any parallelism is a hard invariant of the rebuild
(BASELINE.json input_hint).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

EXTRACTOR_VERSION = 1

_BLOCK_CLOSE = re.compile(rb"</(?:p|div|li|h[1-6]|tr|br)>|<br\s*/?>", re.I)
_HEAD = re.compile(rb"<head\b.*?</head>", re.I | re.S)
_SCRIPT = re.compile(rb"<(script|style)\b.*?</\1>", re.I | re.S)
_TAG = re.compile(rb"<[^>]*>")
_WS_LINE = re.compile(r"[ \t\r\f\v]+")


def extract_text_bytes(html: bytes) -> str:
    """Frozen extractor v1. Rules (in order):

    1. drop <head>...</head> and <script>/<style> blocks;
    2. closing block tags (p/div/li/h1-6/tr/br) become newlines;
    3. every remaining tag is stripped;
    4. the five standard entities are unescaped;
    5. whitespace: runs of spaces/tabs collapse to one space, lines are
       stripped, empty lines dropped, lines joined with a single newline.

    Pure function of the bytes — no locale, no ordering dependence.
    """
    h = _HEAD.sub(b"", html)
    h = _SCRIPT.sub(b"", h)
    h = _BLOCK_CLOSE.sub(b"\n", h)
    h = _TAG.sub(b"", h)
    s = h.decode("utf-8", errors="replace")
    s = (
        s.replace("&lt;", "<")
        .replace("&gt;", ">")
        .replace("&quot;", '"')
        .replace("&#39;", "'")
        .replace("&amp;", "&")
    )
    lines = []
    for line in s.split("\n"):
        line = _WS_LINE.sub(" ", line).strip()
        if line:
            lines.append(line)
    return "\n".join(lines)


def escape_html_text(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def make_page_html(doc_id: int, text: str) -> bytes:
    """Deterministic page wrapper used to synthesize CC-style pages from the
    documents table (FIXTURES.md §1); extract_text_bytes inverts it exactly
    for whitespace-normalized text."""
    body = "".join(f"<p>{escape_html_text(ln)}</p>" for ln in text.split("\n"))
    return (
        f"<html><head><title>doc{doc_id}</title>"
        f'<script>var x="ignore me";</script></head>'
        f"<body>{body}</body></html>"
    ).encode()


def make_page_html_links(doc_id: int, text: str, hrefs: list[str]) -> bytes:
    """make_page_html plus a trailing ``<nav>`` of empty-anchor outlinks.
    Empty anchor text means the frozen extractor output is IDENTICAL to the
    link-free page (every tag strips to nothing) — tested invariant."""
    body = "".join(f"<p>{escape_html_text(ln)}</p>" for ln in text.split("\n"))
    nav = "".join(f'<a href="{h}"></a>' for h in hrefs)
    return (
        f"<html><head><title>doc{doc_id}</title>"
        f'<script>var x="ignore me";</script></head>'
        f"<body>{body}<nav>{nav}</nav></body></html>"
    ).encode()


def extract_text_batch(batch: pa.Table, html_col: str = "html") -> pa.Table:
    htmls = batch.column(html_col).to_pylist()
    texts = [extract_text_bytes(h) for h in htmls]
    return batch.append_column("extracted_text", pa.array(texts, type=pa.string()))


def fix_mojibake(s: str, max_passes: int = 3) -> str:
    """Repair UTF-8-as-Latin-1 double encoding ('Ã©' -> 'é'), the dominant
    web-corpus mojibake class (what CCNet/Dolma run ftfy for). A string is
    re-encoded Latin-1 and re-decoded UTF-8 while that round-trip succeeds
    AND changes it (up to max_passes, for doubly-corrupted text); strings
    with codepoints > U+00FF or invalid UTF-8 byte runs are left alone.
    Pure function — deterministic at any parallelism. Known ftfy-class
    tradeoff (documented): genuine Latin-1 text that happens to be valid
    UTF-8 byte-wise is "fixed" too; on web corpora that false-positive
    rate is negligible vs the mojibake rate."""
    cur = s
    for _ in range(max_passes):
        try:
            b = cur.encode("latin-1")
        except UnicodeEncodeError:
            return cur
        try:
            t = b.decode("utf-8")
        except UnicodeDecodeError:
            return cur
        if t == cur:
            return cur
        cur = t
    return cur


def fix_encoding_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Mojibake-repair stage: adds ``fixed_text`` and ``was_mojibake``.
    ASCII-only batches short-circuit via one Arrow regex match (the
    overwhelmingly common case costs no Python)."""
    import pyarrow.compute as pc

    col = batch.column(text_col)
    ascii_mask = pc.match_substring_regex(col, r"^[\x00-\x7F]*$")
    if pc.all(ascii_mask).as_py():
        n = batch.num_rows
        return batch.append_column(
            "fixed_text", col
        ).append_column("was_mojibake", pa.array([False] * n, pa.bool_()))
    texts = col.to_pylist()
    fixed = [fix_mojibake(t) if t else t for t in texts]
    return batch.append_column(
        "fixed_text", pa.array(fixed, pa.string())
    ).append_column(
        "was_mojibake",
        pa.array([f != t for f, t in zip(fixed, texts)], pa.bool_()),
    )


def extract_pdf_text_batch(
    batch: pa.Table, pdf_col: str = "pdf", on_error: str = "raise"
) -> pa.Table:
    """PDF payloads -> extracted text (functions/pdf.py parse_pdf; pages
    joined with newline). ``on_error="skip"`` drops unparseable payloads
    (web-corpus default — a corrupt PDF costs one row, not the task)."""
    from ..functions.pdf import parse_pdf

    pdfs = batch.column(pdf_col).to_pylist()
    texts, keep = [], []
    for i, p in enumerate(pdfs):
        try:
            texts.append("\n".join(parse_pdf(p)["page_texts"]))
            keep.append(i)
        except Exception:
            if on_error == "raise":
                raise
    out = batch if len(keep) == len(pdfs) else batch.take(keep)
    return out.append_column(
        "extracted_text", pa.array(texts, type=pa.string())
    )


# ---------------- token counting ----------------

_TOKEN_RE = re.compile(r"\S+")
# BPE-ish subword splitter: words, numbers, punctuation runs
_BPE_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]")


def token_stats_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Append n_tokens (whitespace), n_bpeish (regex subword count),
    n_unique (distinct whitespace tokens)."""
    texts = batch.column(text_col).to_pylist()
    n_tok = np.empty(len(texts), dtype=np.int64)
    n_bpe = np.empty(len(texts), dtype=np.int64)
    n_uni = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        toks = _TOKEN_RE.findall(t or "")
        n_tok[i] = len(toks)
        n_uni[i] = len(set(toks))
        n_bpe[i] = len(_BPE_RE.findall(t or ""))
    out = batch.append_column("n_tokens", pa.array(n_tok))
    out = out.append_column("n_bpeish", pa.array(n_bpe))
    return out.append_column("n_unique", pa.array(n_uni))


# ---------------- quality scoring ----------------

_PUNCT_RE = re.compile(r"[.!?,;:]")


def quality_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Heuristic quality signals + a composite score.

    All components are exact integer counts; the score is a single float
    expression identical to the SQL oracle's, so results hash-match.
    """
    texts = batch.column(text_col).to_pylist()
    n = len(texts)
    n_chars = np.empty(n, dtype=np.int64)
    n_tok = np.empty(n, dtype=np.int64)
    n_uni = np.empty(n, dtype=np.int64)
    n_punct = np.empty(n, dtype=np.int64)
    for i, t in enumerate(texts):
        t = t or ""
        toks = t.split(" ") if t else []
        n_chars[i] = len(t)
        n_tok[i] = len(toks)
        n_uni[i] = len(set(toks))
        n_punct[i] = len(_PUNCT_RE.findall(t))
    with np.errstate(divide="ignore", invalid="ignore"):
        uniq_ratio = np.where(n_tok > 0, n_uni / n_tok, 0.0)
        punct_ratio = np.where(n_chars > 0, n_punct / n_chars, 0.0)
    score = 0.5 * uniq_ratio + 0.5 * (1.0 - punct_ratio)
    out = batch.append_column("q_tokens", pa.array(n_tok))
    out = out.append_column("q_unique", pa.array(n_uni))
    out = out.append_column("q_punct", pa.array(n_punct))
    return out.append_column("quality_score", pa.array(score))


# ---------------- language ID (n-gram/stopword heuristic) ----------------

_LANG_MARKERS = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "it", "for", "on"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "den"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "des", "que", "pour"},
    "es": {"el", "la", "los", "las", "es", "un", "una", "que", "por", "para"},
    "pt": {"o", "os", "um", "uma", "com", "para", "das", "dos"},
}


def langid_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Stopword-voting language ID; CJK detected by codepoint range.
    Deterministic ties -> lexicographically smallest language code."""
    texts = batch.column(text_col).to_pylist()
    preds, scores = [], []
    for t in texts:
        t = t or ""
        if any("一" <= ch <= "鿿" for ch in t[:200]):
            preds.append("zh")
            scores.append(1.0)
            continue
        toks = t.lower().split(" ")
        denom = max(len(toks), 1)
        best_lang, best = "en", -1.0
        for lang in sorted(_LANG_MARKERS):
            hits = sum(1 for w in toks if w in _LANG_MARKERS[lang])
            frac = hits / denom
            if frac > best:
                best_lang, best = lang, frac
        preds.append(best_lang)
        scores.append(best)
    out = batch.append_column("pred_lang", pa.array(preds, type=pa.string()))
    return out.append_column("lang_score", pa.array(scores, type=pa.float64()))


# ---------------- fingerprinting ----------------


def md5_fingerprint_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Exact content fingerprint (md5 hex) — matches DuckDB's md5()."""
    texts = batch.column(text_col).to_pylist()
    fps = [hashlib.md5((t or "").encode()).hexdigest() for t in texts]
    return batch.append_column("fingerprint", pa.array(fps, type=pa.string()))


_ROLL_P = (1 << 61) - 1
_ROLL_B = 1000003

_U = np.uint64
_P61 = _U(_ROLL_P)
_MASK32 = _U(0xFFFFFFFF)


def _fold_p61(x: np.ndarray) -> np.ndarray:
    """Reduce x (< 2^64) mod 2^61-1 using 2^61 ≡ 1 (folded twice)."""
    x = (x >> _U(61)) + (x & _P61)
    x = (x >> _U(61)) + (x & _P61)
    return np.where(x >= _P61, x - _P61, x)


def _mulmod_p61(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(a * b) mod 2^61-1 for a, b < 2^61, vectorized via 32-bit splits:
    a*b = a1*b1*2^64 + (a1*b0 + a0*b1)*2^32 + a0*b0 with 2^64 ≡ 8 and
    m*2^32 ≡ (m >> 29) + (m & (2^29-1))*2^32 (since 2^61 ≡ 1)."""
    a = np.asarray(a, dtype=np.uint64)
    b = np.asarray(b, dtype=np.uint64)
    a1, a0 = a >> _U(32), a & _MASK32
    b1, b0 = b >> _U(32), b & _MASK32
    with np.errstate(over="ignore"):
        hi = _fold_p61(a1 * b1 * _U(8))                # a1,b1 < 2^29
        mid = a1 * b0 + a0 * b1                        # < 2^62, no overflow
        mid = _fold_p61((mid >> _U(29)) + ((mid & _U((1 << 29) - 1)) << _U(32)))
        lo = _fold_p61(a0 * b0)                        # < 2^64, fits u64
    return _fold_p61(hi + mid + lo)


#: powers of _ROLL_B mod P, grown on demand (cached per worker)
_POW_B = np.array([1], dtype=np.uint64)


def _powers_b(n: int) -> np.ndarray:
    global _POW_B
    if len(_POW_B) <= n:
        ext = [int(_POW_B[-1])]
        for _ in range(n + 1 - len(_POW_B)):
            ext.append(ext[-1] * _ROLL_B % _ROLL_P)
        _POW_B = np.concatenate([_POW_B, np.array(ext[1:], dtype=np.uint64)])
    return _POW_B


def rolling_fingerprint_batch(
    batch: pa.Table, text_col: str = "text", window: int = 8
) -> pa.Table:
    """Winnowing-style document fingerprint: min rolling hash over word
    ``window``-grams (deterministic polynomial hash, no Python hash()).

    Vectorized: a word w-gram joined by ' ' is an exact byte substring of the
    text (split(' ') boundaries are single spaces), so gram hashes come from
    prefix polynomial hashes — H computed in one column-wise pass over the
    batch's byte matrix (vectorized across docs), then
    hash(s, e) = H[e] - H[s] * B^(e-s) mod 2^61-1 per gram, all numpy."""
    texts = batch.column(text_col).to_pylist()
    n = len(texts)
    fps = np.empty(n, dtype=np.uint64)
    if n == 0:
        return batch.append_column("doc_fp", pa.array(fps, type=pa.uint64()))
    bts = [(t or "").encode() for t in texts]
    lens = np.fromiter((len(b) for b in bts), dtype=np.int64, count=n)
    maxlen = int(lens.max())
    # (maxlen, n) byte matrix: the time loop reads CONTIGUOUS rows
    matT = np.zeros((max(maxlen, 1), n), dtype=np.uint64)
    for i, b in enumerate(bts):
        if b:
            matT[: len(b), i] = np.frombuffer(b, dtype=np.uint8)
    # prefix hashes: H[k] = hash of first k bytes; the time loop is over byte
    # POSITION (few hundred), each step vectorized over the batch. Multiply
    # by the SMALL base B < 2^20 via a 41-bit split (cheaper than the general
    # mulmod): h*B = (h>>41)*B*2^41 + (h&M41)*B, with z*2^41 ≡
    # (z>>20) + (z&M20)*2^41 mod 2^61-1.
    H = np.zeros((maxlen + 1, n), dtype=np.uint64)
    h = np.zeros(n, dtype=np.uint64)
    B = _U(_ROLL_B)
    M41 = _U((1 << 41) - 1)
    M20 = _U((1 << 20) - 1)
    with np.errstate(over="ignore"):
        for k in range(maxlen):
            z = (h >> _U(41)) * B
            x = (z >> _U(20)) + ((z & M20) << _U(41)) + (h & M41) * B + matT[k]
            h = (x >> _U(61)) + (x & _P61)  # < P + 4: one lazy fold
            h = np.where(h >= _P61, h - _P61, h)
            H[k + 1] = h
    HT = np.ascontiguousarray(H.T)  # (n, maxlen+1): per-doc gather below
    pw = _powers_b(maxlen)

    # gram boundaries for ALL docs at once: global space positions from the
    # transposed matrix, grouped per doc
    pos_all, doc_all = np.nonzero(matT == 32)  # sorted by (pos, doc) — resort
    order = np.lexsort((pos_all, doc_all))
    doc_all, pos_all = doc_all[order], pos_all[order]
    valid = pos_all < lens[doc_all]  # padding zeros are never 32; guard anyway
    doc_all, pos_all = doc_all[valid], pos_all[valid]
    nsp = np.bincount(doc_all, minlength=n)  # spaces per doc
    sp_starts = np.concatenate([[0], np.cumsum(nsp)[:-1]])
    ntoks = nsp + 1

    # docs with >= window tokens: gram j of doc i spans bytes
    # [tstart_j, space_{j+window-1}) with the last gram ending at len
    big = ntoks >= window
    ngrams = np.where(big, ntoks - window + 1, 1)
    g_doc = np.repeat(np.arange(n), ngrams)
    g_j = np.arange(len(g_doc)) - np.repeat(
        np.concatenate([[0], np.cumsum(ngrams)[:-1]]), ngrams
    )
    gb = big[g_doc]
    base = sp_starts[g_doc]
    # np.where evaluates both branches -> clamp indices into a non-empty view
    pos_safe = pos_all if len(pos_all) else np.zeros(1, dtype=np.int64)
    clamp = len(pos_safe) - 1
    # start byte: 0 for j==0 else space[j-1]+1 (small docs: whole text)
    s = np.where(
        gb & (g_j > 0), pos_safe[np.clip(base + g_j - 1, 0, clamp)] + 1, 0
    )
    # end byte: space[j+window-1] except the last gram -> len
    last = g_j == ngrams[g_doc] - 1
    e = np.where(
        gb & ~last,
        pos_safe[np.clip(base + g_j + window - 1, 0, clamp)],
        lens[g_doc],
    )
    hv = _fold_p61(
        HT[g_doc, e] + _P61 - _mulmod_p61(HT[g_doc, s], pw[e - s])
    )
    fps[:] = np.minimum.reduceat(hv, np.concatenate([[0], np.cumsum(ngrams)[:-1]]))
    return batch.append_column("doc_fp", pa.array(fps, type=pa.uint64()))


# ---------------- deterministic sampling ----------------


def _sample_frac(keys: np.ndarray, salt: str) -> np.ndarray:
    """Deterministic per-key uniform fraction: first 8 md5 hex digits of
    '{salt}:{key}' / 2^32 — reproducible at any parallelism and exactly
    expressible in SQL (the Morton/geocode hex-cast trick)."""
    out = np.empty(len(keys), dtype=np.float64)
    for i, k in enumerate(keys):
        h = int(hashlib.md5(f"{salt}:{int(k)}".encode()).hexdigest()[:8], 16)
        out[i] = h / 4294967296.0
    return out


def sample_batch(
    batch: pa.Table, rate: float, id_col: str = "doc_id", salt: str = "sample"
) -> pa.Table:
    """Bernoulli(rate) sample keyed on a deterministic id hash — the
    distributed-sampling shape: a pure per-row filter, no coordination, the
    SAME rows survive at any parallelism or retry (unlike rng-based
    Dataset.random_sample)."""
    keys = batch.column(id_col).to_numpy()
    keep = _sample_frac(keys, salt) < rate
    return batch.filter(pa.array(keep))


def stratified_sample_batch(
    batch: pa.Table,
    rates: dict,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
    salt: str = "strata",
) -> pa.Table:
    """Per-stratum Bernoulli rates (e.g. downsample dominant languages):
    same deterministic hash, rate chosen by the stratum column."""
    keys = batch.column(id_col).to_numpy()
    strata = batch.column(strata_col).to_numpy(zero_copy_only=False)
    frac = _sample_frac(keys, salt)
    rate_arr = np.array([rates.get(s, default_rate) for s in strata])
    return batch.filter(pa.array(frac < rate_arr))


def chunk_batch(
    batch: pa.Table,
    size: int = 512,
    overlap: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> pa.Table:
    """Fixed-size character chunking with overlap — the standard
    training-data prep step before tokenization. Chunk i starts at
    ``i * (size - overlap)``; starts are generated while start < len(text),
    so the last chunk may be shorter and empty documents emit no chunks.
    A flat_map-shaped batch transform: one input row fans out to
    ceil(len / step) rows.

    Chunk boundaries are deterministic and SQL-expressible
    (generate_series + substr), so the operator carries a bit-exact
    DuckDB oracle."""
    if overlap >= size:
        raise ValueError("overlap must be smaller than size")
    step = size - overlap
    ids = batch.column(id_col).to_numpy()
    texts = batch.column(text_col).to_pylist()
    out_id: list[int] = []
    out_idx: list[int] = []
    out_start: list[int] = []
    out_text: list[str] = []
    for did, t in zip(ids, texts):
        n = len(t)
        for i, s in enumerate(range(0, n, step)):
            out_id.append(int(did))
            out_idx.append(i)
            out_start.append(s)
            out_text.append(t[s : s + size])
    return pa.table(
        {
            "doc_id": pa.array(out_id, pa.int64()),
            "chunk_idx": pa.array(out_idx, pa.int64()),
            "char_start": pa.array(out_start, pa.int64()),
            "chunk": pa.array(out_text, pa.string()),
        }
    )


def chunk_documents(ds, size: int = 512, overlap: int = 64,
                    text_col: str = "text", id_col: str = "doc_id"):
    """Dataset of (doc_id, chunk_idx, char_start, chunk) rows."""
    return ds.map_batches(
        lambda b: chunk_batch(b, size, overlap, text_col, id_col),
        batch_format="pyarrow",
    )


def ngram_count_batch(
    batch: pa.Table, n: int = 2, text_col: str = "text"
) -> pa.Table:
    """Per-batch PARTIAL n-gram counts (whitespace tokens joined by a single
    space). This is the combiner half of the corpus-level count: each batch
    pre-aggregates locally so the shuffle moves one row per distinct n-gram
    per batch instead of one per occurrence — the
    partial-aggregate-before-groupby pattern (SURVEY.md §4)."""
    from collections import Counter

    counts: Counter = Counter()
    for t in batch.column(text_col).to_pylist():
        toks = t.split()
        for i in range(len(toks) - n + 1):
            counts[" ".join(toks[i : i + n])] += 1
    return pa.table(
        {
            "ngram": pa.array(list(counts.keys()), pa.string()),
            "cnt": pa.array(list(counts.values()), pa.int64()),
        }
    )


def ngram_counts(ds, n: int = 2, text_col: str = "text"):
    """Corpus-level n-gram frequency table: Dataset of (ngram, cnt)."""
    partial = ds.map_batches(
        lambda b: ngram_count_batch(b, n, text_col), batch_format="pyarrow"
    )
    agg = partial.groupby("ngram").sum("cnt")
    return agg.map_batches(
        lambda b: b.rename_columns(["ngram", "cnt"]), batch_format="pyarrow"
    )


def _doc_ngrams(text: str, n: int) -> set:
    toks = text.split()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def contamination_counts(
    ds,
    test_ngrams,
    n: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Test-set decontamination: per document, how many DISTINCT n-grams it
    shares with a held-out test set. The test set is broadcast once via
    ray.put and probed inside map_batches — a broadcast semi-join, no
    shuffle (SURVEY.md §4: broadcast small sides). Output: (doc_id, n_hits)
    for every document, 0 when clean; filter n_hits > 0 to decontaminate."""
    import ray as _ray

    ref = _ray.put(frozenset(test_ngrams))

    def probe(batch: pa.Table) -> pa.Table:
        tset = _ray.get(ref)
        ids = batch.column(id_col).to_numpy()
        hits = [
            len(_doc_ngrams(t, n) & tset)
            for t in batch.column(text_col).to_pylist()
        ]
        return pa.table(
            {
                "doc_id": pa.array([int(i) for i in ids], pa.int64()),
                "n_hits": pa.array(hits, pa.int64()),
            }
        )

    return ds.map_batches(probe, batch_format="pyarrow")


# ---------------- repetition / Gopher-style quality gates ----------------


def repetition_stats_batch(
    batch: pa.Table, id_col: str = "doc_id", text_col: str = "text"
) -> pa.Table:
    """Gopher-style repetition signals per document (Rae et al. 2021 §A1.1
    style): ``top_word_frac`` (most frequent word's share of all words) and
    ``dup_2gram_frac`` (share of 2-gram occurrences that are repeats), plus
    a ``keep`` gate (top_word_frac <= 0.3 AND dup_2gram_frac <= 0.2).
    Exact integer counts; the two fractions are single IEEE divisions, so
    the DuckDB oracle hash-matches bit-for-bit."""
    ids = batch.column(id_col).to_numpy()
    texts = batch.column(text_col).to_pylist()
    n = len(texts)
    n_words = np.zeros(n, dtype=np.int64)
    top_frac = np.zeros(n, dtype=np.float64)
    dup_frac = np.zeros(n, dtype=np.float64)
    for i, t in enumerate(texts):
        toks = [w for w in (t or "").split(" ") if w]
        nw = len(toks)
        n_words[i] = nw
        if nw == 0:
            continue
        arr = np.asarray(toks, dtype=object)
        _, counts = np.unique(arr, return_counts=True)
        top_frac[i] = int(counts.max()) / nw
        if nw >= 2:
            grams = np.asarray(
                [" ".join(toks[j : j + 2]) for j in range(nw - 1)],
                dtype=object,
            )
            tot = nw - 1
            dst = len(np.unique(grams))
            dup_frac[i] = (tot - dst) / tot
    keep = (top_frac <= 0.3) & (dup_frac <= 0.2)
    return pa.table(
        {
            id_col: pa.array(ids, pa.int64()),
            "n_words": pa.array(n_words, pa.int64()),
            "top_word_frac": pa.array(top_frac, pa.float64()),
            "dup_2gram_frac": pa.array(dup_frac, pa.float64()),
            "keep": pa.array(keep, pa.bool_()),
        }
    )


# ---------------- TF-IDF scoring (rational idf; bit-exact oracle) --------


def tfidf_topk(
    ds,
    terms: list[str],
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Top-k documents by a bag-of-terms TF-IDF score.

    idf is the RATIONAL form N/df (no transcendental ln, so DuckDB and
    numpy produce bit-identical doubles); score = sum over the given terms
    IN ORDER of tf * (N / df) — the summation order is part of the
    contract. Two corpus passes: (1) a tiny (N, df per term) aggregate,
    (2) per-batch scoring + per-batch deterministic top-k partials, with a
    single-group finalize. Docs with score 0 are excluded."""
    import ray

    terms = list(terms)

    def df_partial(b: pa.Table) -> pa.Table:
        texts = b.column(text_col).to_pylist()
        dfs = np.zeros(len(terms), dtype=np.int64)
        for t in texts:
            toks = set((t or "").split(" "))
            for ti, term in enumerate(terms):
                if term in toks:
                    dfs[ti] += 1
        return pa.table(
            {
                "ti": pa.array(np.arange(len(terms) + 1), pa.int64()),
                "cnt": pa.array(np.append(dfs, len(texts)), pa.int64()),
            }
        )

    agg = (
        ds.map_batches(df_partial, batch_format="pyarrow")
        .groupby("ti")
        .sum("cnt")
        .to_pandas()
        .sort_values("ti")
    )
    counts = agg["sum(cnt)"].to_numpy(np.int64)
    dfs, n_docs = counts[:-1], int(counts[-1])
    weights = np.where(dfs > 0, n_docs / np.maximum(dfs, 1), 0.0)
    w_ref = ray.put(weights)

    def score_partial(b: pa.Table) -> pa.Table:
        w = ray.get(w_ref)
        ids = b.column(id_col).to_numpy().astype(np.int64)
        texts = b.column(text_col).to_pylist()
        toklists = [(t or "").split(" ") for t in texts]  # tokenize once
        score = np.zeros(len(texts), dtype=np.float64)
        for ti, term in enumerate(terms):
            tf = np.fromiter(
                (toks.count(term) for toks in toklists),
                dtype=np.int64,
                count=len(toklists),
            )
            # fixed term order: score accumulates term-by-term (IEEE order
            # matches the SQL oracle's explicit left-to-right sum)
            score = score + tf * w[ti]
        pos = score > 0.0
        ids, score = ids[pos], score[pos]
        kk = min(k, len(ids))
        ord_ = np.lexsort((ids, -score))[:kk]
        return pa.table(
            {
                "g": pa.array(np.zeros(kk, np.int64), pa.int64()),
                id_col: pa.array(ids[ord_], pa.int64()),
                "score": pa.array(score[ord_], pa.float64()),
            }
        )

    cand = ds.map_batches(score_partial, batch_format="pyarrow")

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["score", id_col], ascending=[False, True]
        ).head(k)
        return g[[id_col, "score"]].reset_index(drop=True)

    return cand.groupby("g").map_groups(finalize, batch_format="pandas")


# --------------------------------------------------------------------------
# PII redaction
# --------------------------------------------------------------------------

#: (name, RE2 pattern, replacement) — applied IN ORDER; both pyarrow and
#: DuckDB compile these with RE2, so redaction is bit-reproducible in SQL.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def pii_redact_batch(
    batch: pa.Table, text_col: str = "text", id_col: str = "doc_id"
) -> pa.Table:
    """Redact emails, phone numbers and IPv4 addresses from a text column,
    entirely with Arrow RE2 kernels (no Python loop): per pattern, count the
    matches then globally replace, in a fixed order (so a phone number never
    half-matches the IP rule after '<PHONE>' substitution). Output:
    (doc_id, n_email, n_phone, n_ip, clean_text). A training-data scrub
    stage the reference has no analog for; per-doc counts feed audit stats.
    """
    txt = batch.column(text_col)
    cols: dict = {id_col: batch.column(id_col)}
    for name, pat, repl in PII_PATTERNS:
        cols[f"n_{name}"] = pc.cast(
            pc.count_substring_regex(txt, pat), pa.int64()
        )
        txt = pc.replace_substring_regex(txt, pat, repl)
    cols["clean_text"] = txt
    return pa.table(cols)


# --------------------------------------------------------------------------
# token-rarity scoring (corpus-frequency LM proxy)
# --------------------------------------------------------------------------


def token_rarity(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_vocab: int | None = None,
):
    """Score each document by the mean corpus frequency of its tokens — the
    classic cheap proxy for a unigram-LM quality filter (docs full of rare
    garbage tokens score low, boilerplate scores high). Two-phase shape:

    1. corpus unigram counts via :func:`ngram_counts` (per-batch Counter
       partials, then one small groupby — the combiner pattern);
    2. the frequency table is the SMALL side: broadcast once via ``ray.put``
       and probed inside ``map_batches`` — no second shuffle of the corpus.

    ``max_vocab`` bounds broadcast memory at web scale: only the most
    frequent ``max_vocab`` tokens keep their true counts (ties broken by
    token text for determinism); everything else probes as count 1 — a
    documented floor, exact when ``max_vocab=None``. Output per doc:
    (doc_id, n_tokens, freq_sum, mean_tok_freq); zero-token docs keep a row
    with NULL mean.
    """
    import ray as _ray

    counts = ngram_counts(ds, n=1, text_col=text_col)
    vocab: dict = {}
    for b in counts.iter_batches(batch_format="pyarrow"):
        vocab.update(
            zip(b.column("ngram").to_pylist(), b.column("cnt").to_pylist())
        )
    if max_vocab is not None and len(vocab) > max_vocab:
        keep = sorted(vocab.items(), key=lambda kv: (-kv[1], kv[0]))
        vocab = dict(keep[:max_vocab])
    ref = _ray.put(vocab)

    def probe(batch: pa.Table) -> pa.Table:
        v = _ray.get(ref)
        ids = batch.column(id_col).to_numpy()
        n_toks: list[int] = []
        sums: list[int] = []
        for t in batch.column(text_col).to_pylist():
            toks = (t or "").split()
            n_toks.append(len(toks))
            sums.append(sum(v.get(tok, 1) for tok in toks))
        means = [
            (float(s) / n if n else None) for s, n in zip(sums, n_toks)
        ]
        return pa.table(
            {
                "doc_id": pa.array(ids.astype(np.int64), pa.int64()),
                "n_tokens": pa.array(n_toks, pa.int64()),
                "freq_sum": pa.array(sums, pa.int64()),
                "mean_tok_freq": pa.array(means, pa.float64()),
            }
        )

    return ds.map_batches(probe, batch_format="pyarrow")


def bigram_coherence(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_vocab: int | None = None,
):
    """Corpus-bigram-LM coherence score — the cheap stand-in for the CCNet /
    Gopher LM-perplexity quality filter (Wenzek et al. 2020 train a 5-gram
    LM; here the corpus itself is the LM). Per document:

        coherence = mean over positions i of
                    count(w_i w_{i+1}) / count(w_i)

    i.e. the average empirical conditional probability of each next word.
    Incoherent/shuffled text scores near 1/vocab; boilerplate scores high.

    All arithmetic is RATIONAL count ratios (no log), each ratio a single
    int64/int64 float division, summed in STRICT position order (np.cumsum's
    left fold == DuckDB list_reduce's left fold) then one division by the
    bigram count — so the SQL oracle is bit-exact, the same discipline as
    tfidf_topk.

    Distributed shape: two small count tables (unigrams, bigrams) built with
    the per-batch-Counter + groupby-sum combiner, broadcast once via
    ``ray.put``, probed inside one ``map_batches`` pass — document text
    never shuffles. ``max_vocab`` bounds the broadcast for web-scale corpora
    (most-frequent entries kept, ties by text; unseen probes floor at count
    1 — exact when None, like token_rarity). Output per doc: (doc_id,
    n_bigrams, coherence); docs with <2 tokens keep a row with NULL score.
    """
    import ray as _ray

    def _collect(counts_ds) -> dict:
        out: dict = {}
        for b in counts_ds.iter_batches(batch_format="pyarrow"):
            out.update(
                zip(b.column("ngram").to_pylist(), b.column("cnt").to_pylist())
            )
        if max_vocab is not None and len(out) > max_vocab:
            keep = sorted(out.items(), key=lambda kv: (-kv[1], kv[0]))
            out = dict(keep[:max_vocab])
        return out

    uni_ref = _ray.put(_collect(ngram_counts(ds, n=1, text_col=text_col)))
    bi_ref = _ray.put(_collect(ngram_counts(ds, n=2, text_col=text_col)))

    def probe(batch: pa.Table) -> pa.Table:
        uni = _ray.get(uni_ref)
        bi = _ray.get(bi_ref)
        ids = batch.column(id_col).to_numpy()
        n_bg = np.empty(len(ids), dtype=np.int64)
        scores: list[float | None] = []
        for i, t in enumerate(batch.column(text_col).to_pylist()):
            toks = (t or "").split()
            m = len(toks) - 1
            n_bg[i] = max(m, 0)
            if m <= 0:
                scores.append(None)
                continue
            c2 = np.fromiter(
                (
                    bi.get(toks[j] + " " + toks[j + 1], 1)
                    for j in range(m)
                ),
                dtype=np.float64,
                count=m,
            )
            c1 = np.fromiter(
                (uni.get(toks[j], 1) for j in range(m)),
                dtype=np.float64,
                count=m,
            )
            # strict left-to-right fold, then one division: bit-matches the
            # oracle's list_reduce((a,b)->a+b) / len
            scores.append(float(np.cumsum(c2 / c1)[-1]) / m)
        return pa.table(
            {
                "doc_id": pa.array(ids.astype(np.int64), pa.int64()),
                "n_bigrams": pa.array(n_bg),
                "coherence": pa.array(scores, pa.float64()),
            }
        )

    return ds.map_batches(probe, batch_format="pyarrow")


def bm25_topk(
    ds,
    terms: list[str],
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Top-k documents by BM25 (k1 = 1.2, b = 0.75) over a bag of query
    terms — the retrieval companion to ``tfidf_topk``.

    idf is the RATIONAL Robertson form without the log:
    ``(N - df + 0.5) / (df + 0.5)`` — every arithmetic step is a plain
    IEEE double op written identically in the SQL oracle, so scores are
    bit-exact. Per-term contribution (fixed left-to-right order):

        idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl)))

    ``dl`` = non-empty whitespace token count; ``avgdl`` = corpus mean.

    Scale shape (same as tfidf_topk): pass 1 is a tiny (df per term, N,
    sum dl) aggregate — per-batch partials, a few rows per block; pass 2
    scores per batch and keeps a deterministic per-batch top-k partial, so
    the finalize group sees at most k rows per block.
    """
    import ray

    terms = list(terms)
    if not terms:
        raise ValueError("bm25_topk: need at least one query term")
    if k < 1:
        raise ValueError("bm25_topk: k must be >= 1")
    nt = len(terms)

    def df_partial(b: pa.Table) -> pa.Table:
        texts = b.column(text_col).to_pylist()
        dfs = np.zeros(nt, dtype=np.int64)
        dl_sum = 0
        for t in texts:
            toks = [x for x in (t or "").split(" ") if x]
            dl_sum += len(toks)
            st = set(toks)
            for ti, term in enumerate(terms):
                if term in st:
                    dfs[ti] += 1
        return pa.table(
            {
                "ti": pa.array(np.arange(nt + 2), pa.int64()),
                "cnt": pa.array(
                    np.append(dfs, [len(texts), dl_sum]), pa.int64()
                ),
            }
        )

    agg = (
        ds.map_batches(df_partial, batch_format="pyarrow")
        .groupby("ti")
        .sum("cnt")
        .to_pandas()
        .sort_values("ti")
    )
    counts = agg["sum(cnt)"].to_numpy(np.int64)
    dfs, n_docs, sum_dl = counts[:-2], int(counts[-2]), int(counts[-1])
    avgdl = float(sum_dl) / float(n_docs) if n_docs else 1.0
    idf = np.where(
        dfs > 0, ((n_docs - dfs) + 0.5) / (dfs + 0.5), 0.0
    )
    w_ref = ray.put((idf, avgdl))

    def score_partial(b: pa.Table) -> pa.Table:
        idf_w, avg = ray.get(w_ref)
        ids = b.column(id_col).to_numpy().astype(np.int64)
        texts = b.column(text_col).to_pylist()
        toklists = [[x for x in (t or "").split(" ") if x] for t in texts]
        dl = np.fromiter(
            (len(t) for t in toklists), dtype=np.int64, count=len(toklists)
        )
        score = np.zeros(len(texts), dtype=np.float64)
        for ti, term in enumerate(terms):
            tf = np.fromiter(
                (toks.count(term) for toks in toklists),
                dtype=np.int64,
                count=len(toklists),
            )
            # expression order is the contract (matches the SQL oracle):
            # ((idf * (tf*2.2)) / (tf + 1.2*(0.25 + 0.75*(dl/avgdl))))
            score = score + idf_w[ti] * (tf * 2.2) / (
                tf + 1.2 * (0.25 + 0.75 * (dl / avg))
            )
        pos = score > 0.0
        ids, score = ids[pos], score[pos]
        kk = min(k, len(ids))
        ord_ = np.lexsort((ids, -score))[:kk]
        return pa.table(
            {
                "g": pa.array(np.zeros(kk, np.int64), pa.int64()),
                id_col: pa.array(ids[ord_], pa.int64()),
                "score": pa.array(score[ord_], pa.float64()),
            }
        )

    cand = ds.map_batches(score_partial, batch_format="pyarrow")

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", id_col], ascending=[False, True]).head(k)
        return g[[id_col, "score"]].reset_index(drop=True)

    return cand.groupby("g").map_groups(finalize, batch_format="pandas")


#: (RE2 pattern, replacement) — applied IN ORDER, global; identical
#: semantics in pyarrow and DuckDB (both RE2), so normalization is
#: SQL-reproducible like PII_PATTERNS.
NORMALIZE_RULES = (
    (r"[\t\r\f\v]+", " "),   # control whitespace -> single space
    (r" {2,}", " "),         # collapse space runs
    (r"^ +", ""),            # leading spaces
    (r" +$", ""),            # trailing spaces
)


def normalize_text_batch(
    batch: pa.Table, text_col: str = "text", out_col: str = "norm_text"
) -> pa.Table:
    """Whitespace normalization with Arrow RE2 kernels (no Python loop):
    the frozen rule list above, applied in order. Emits the normalized
    text plus ``n_changed`` (0/1 whether any rule fired) for audit."""
    s = batch.column(text_col)
    orig = s
    for pat, rep in NORMALIZE_RULES:
        s = pc.replace_substring_regex(s, pattern=pat, replacement=rep)
    changed = pc.cast(pc.not_equal(s, orig), pa.int64())
    out = batch.append_column(out_col, s)
    return out.append_column("n_changed", changed)


def cooccurrence_pmi(
    ds,
    vocab_k: int = 50,
    min_pair_count: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Document-level token co-occurrence with a rational PMI score.

    Vocabulary = the ``vocab_k`` most frequent whitespace tokens (ties ->
    lexicographically smaller token). For every unordered vocab pair
    (a < b), ``c_ab`` = number of documents containing BOTH, and the
    rational PMI ratio ``(N * c_ab) / (c_a * c_b)`` (no log — every value
    is one exact int product and one IEEE division, so the score is
    bit-exact in SQL). Pairs with ``c_ab >= min_pair_count`` are returned.

    Scale shape: pass 1 is the existing n-gram-counts combiner (tiny);
    the vocab broadcasts once; pass 2 emits per-batch PAIR-COUNT partials
    (Counter over <= vocab_k²/2 keys per batch — bounded by the vocab,
    not the corpus), and one small groupby-sum finalizes. Document text
    never shuffles.

    c_a / c_b are DOCUMENT frequencies (distinct docs containing the
    token), consistent with c_ab.
    """
    import ray
    from collections import Counter

    # pass 1: document frequency per token (per-batch distinct + Counter)
    def df_partial(b: pa.Table) -> pa.Table:
        cnt = Counter()
        ndocs = 0
        for t in b.column(text_col).to_pylist():
            ndocs += 1
            cnt.update(set((t or "").split(" ")) - {""})
        toks = list(cnt.keys())
        return pa.table(
            {
                "tok": pa.array(toks + ["\x00__N__"], pa.string()),
                "c": pa.array(
                    [cnt[t] for t in toks] + [ndocs], pa.int64()
                ),
            }
        )

    dfreq = (
        ds.map_batches(df_partial, batch_format="pyarrow")
        .groupby("tok")
        .sum("c")
        .to_pandas()
    )
    if len(dfreq) == 0:  # empty corpus (to_pandas drops columns on empty)
        import ray.data as _rd

        return _rd.from_arrow(
            pa.table(
                {
                    "tok_a": pa.array([], pa.string()),
                    "tok_b": pa.array([], pa.string()),
                    "c_ab": pa.array([], pa.int64()),
                    "pmi_ratio": pa.array([], pa.float64()),
                }
            )
        )
    dfreq.columns = ["tok", "c"]
    n_docs = int(dfreq.loc[dfreq["tok"] == "\x00__N__", "c"].iloc[0])
    dfreq = dfreq[dfreq["tok"] != "\x00__N__"]
    dfreq = dfreq.sort_values(
        ["c", "tok"], ascending=[False, True], kind="mergesort"
    ).head(vocab_k)
    vocab = sorted(dfreq["tok"].tolist())
    dfc = dict(zip(dfreq["tok"], dfreq["c"].astype(int)))
    vref = ray.put((vocab, dfc, n_docs))

    def pair_partial(b: pa.Table) -> pa.Table:
        voc, _, _ = ray.get(vref)
        vset = set(voc)
        cnt = Counter()
        for t in b.column(text_col).to_pylist():
            present = sorted(set((t or "").split(" ")) & vset)
            for i in range(len(present)):
                for j in range(i + 1, len(present)):
                    cnt[(present[i], present[j])] += 1
        keys = list(cnt.keys())
        return pa.table(
            {
                "tok_a": pa.array([k[0] for k in keys], pa.string()),
                "tok_b": pa.array([k[1] for k in keys], pa.string()),
                "c_ab": pa.array([cnt[k] for k in keys], pa.int64()),
            }
        )

    pairs = (
        ds.map_batches(pair_partial, batch_format="pyarrow")
        .groupby(["tok_a", "tok_b"])
        .sum("c_ab")
    )

    def finalize(b: pa.Table) -> pa.Table:
        _, dc, n = ray.get(vref)
        ta = b.column("tok_a").to_pylist()
        tb = b.column("tok_b").to_pylist()
        cab = b.column("sum(c_ab)").to_numpy().astype(np.int64)
        keep = cab >= min_pair_count
        ta = [t for t, k in zip(ta, keep) if k]
        tb = [t for t, k in zip(tb, keep) if k]
        cab = cab[keep]
        ca = np.array([dc[t] for t in ta], dtype=np.int64)
        cb = np.array([dc[t] for t in tb], dtype=np.int64)
        pmi = (n * cab) / (ca * cb)
        return pa.table(
            {
                "tok_a": pa.array(ta, pa.string()),
                "tok_b": pa.array(tb, pa.string()),
                "c_ab": pa.array(cab, pa.int64()),
                "pmi_ratio": pa.array(pmi, pa.float64()),
            }
        )

    return pairs.map_batches(finalize, batch_format="pyarrow")


def keyword_topk(
    ds,
    m: int = 3,
    max_vocab: int = 50_000,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Per-document keyword extraction: the top-m tokens by TF-IDF with
    the rational idf N/df (doc tagging / faceting for curation UIs).

    Shape: pass 1 aggregates the corpus document-frequency table (per-batch
    distinct-token Counter partials -> one small groupby) and broadcasts
    the top ``max_vocab`` tokens (ties -> lexicographically smaller) once;
    pass 2 scores each document against its OWN tokens inside map_batches
    and emits its top-m rows — NO shuffle at all after the df aggregate.
    Tokens outside the capped vocabulary are not scored (the cap bounds
    broadcast memory at web scale, same contract as token_rarity).

    Output: (doc_id, term, score, rnk) with rnk 1..m per doc, ordered by
    (score DESC, term) within a doc.
    """
    import ray
    from collections import Counter

    def df_partial(b: pa.Table) -> pa.Table:
        cnt = Counter()
        ndocs = 0
        for t in b.column(text_col).to_pylist():
            ndocs += 1
            cnt.update(set((t or "").split(" ")) - {""})
        toks = list(cnt.keys())
        return pa.table(
            {
                "tok": pa.array(toks + ["\x00__N__"], pa.string()),
                "c": pa.array([cnt[t] for t in toks] + [ndocs], pa.int64()),
            }
        )

    dfreq = (
        ds.map_batches(df_partial, batch_format="pyarrow")
        .groupby("tok")
        .sum("c")
        .to_pandas()
    )
    if len(dfreq) == 0:  # empty corpus (to_pandas drops columns on empty)
        import ray.data as _rd

        return _rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "term": pa.array([], pa.string()),
                    "score": pa.array([], pa.float64()),
                    "rnk": pa.array([], pa.int64()),
                }
            )
        )
    dfreq.columns = ["tok", "c"]
    n_docs = int(dfreq.loc[dfreq["tok"] == "\x00__N__", "c"].iloc[0])
    dfreq = dfreq[dfreq["tok"] != "\x00__N__"]
    dfreq = dfreq.sort_values(
        ["c", "tok"], ascending=[False, True], kind="mergesort"
    ).head(max_vocab)
    dfc = dict(zip(dfreq["tok"], dfreq["c"].astype(int)))
    vref = ray.put((dfc, n_docs))

    def score(b: pa.Table) -> pa.Table:
        dc, n = ray.get(vref)
        out_id: list[int] = []
        out_t: list[str] = []
        out_s: list[float] = []
        out_r: list[int] = []
        ids = b.column(id_col).to_numpy()
        for did, t in zip(ids, b.column(text_col).to_pylist()):
            cnt = Counter(x for x in (t or "").split(" ") if x in dc)
            if not cnt:
                continue
            terms = sorted(cnt.keys())
            tf = np.array([cnt[x] for x in terms], dtype=np.int64)
            df_ = np.array([dc[x] for x in terms], dtype=np.int64)
            sc = tf * (n / df_.astype(np.float64))
            order = np.lexsort((np.array(terms, dtype=object), -sc))[:m]
            for r, oi in enumerate(order, 1):
                out_id.append(int(did))
                out_t.append(terms[oi])
                out_s.append(float(sc[oi]))
                out_r.append(r)
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "term": pa.array(out_t, pa.string()),
                "score": pa.array(out_s, pa.float64()),
                "rnk": pa.array(out_r, pa.int64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


def bpe_pair_counts(ds, text_col: str = "text", k: int = 50):
    """First merge round of BPE tokenizer training: corpus-wide adjacent
    CODEPOINT pair counts, top-k by (count DESC, pair ASC).

    Per batch, every text decodes to a uint32 codepoint array once
    (utf-32-le view — matches SQL substr character semantics for any
    unicode, not just ASCII); adjacent pairs pack into one int64
    (hi << 21 | lo, codepoints < 2^21) and a single np.unique counts the
    whole batch. The exchange is the distinct-pair partial table (bounded
    by alphabet^2 in practice), then one groupby-sum and a partial top-k
    finalize — the same combiner shape as ngram_counts. Iterating the
    merge loop re-runs this op on re-paired symbols; round 0 is the
    distributed-count primitive every round shares.
    """
    import ray.data

    def partial(b: pa.Table) -> pa.Table:
        texts = b.column(text_col).to_pylist()
        arrs = []
        for t in texts:
            if not t or len(t) < 2:
                continue
            cp = np.frombuffer(
                t.encode("utf-32-le"), dtype=np.uint32
            ).astype(np.int64)
            arrs.append((cp[:-1] << 21) | cp[1:])
        if not arrs:
            return pa.table(
                {"code": pa.array([], pa.int64()),
                 "cnt": pa.array([], pa.int64())}
            )
        uniq, cnt = np.unique(np.concatenate(arrs), return_counts=True)
        return pa.table(
            {"code": pa.array(uniq, pa.int64()),
             "cnt": pa.array(cnt.astype(np.int64), pa.int64())}
        )

    sums = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("code")
        .sum("cnt")
        .map_batches(
            lambda b: b.rename_columns(["code", "cnt"]),
            batch_format="pyarrow",
        )
    )

    def topk_part(b: pa.Table) -> pa.Table:
        code = b.column("code").to_numpy()
        cnt = b.column("cnt").to_numpy()
        pairs = np.array(
            [chr(c >> 21) + chr(c & ((1 << 21) - 1)) for c in code],
            dtype=object,
        )
        order = np.lexsort((pairs, -cnt))[:k]
        return pa.table(
            {
                "g": pa.array(np.zeros(len(order), np.int64), pa.int64()),
                "pair": pa.array(pairs[order], pa.string()),
                "cnt": pa.array(cnt[order].astype(np.int64), pa.int64()),
            }
        )

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["cnt", "pair"], ascending=[False, True], kind="mergesort"
        ).head(k)
        return g[["pair", "cnt"]].reset_index(drop=True)

    return (
        sums.map_batches(topk_part, batch_format="pyarrow")
        .groupby("g")
        .map_groups(finalize, batch_format="pandas")
    )


def t5_span_masks(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    block: int = 3,
    rate_mod: int = 7,
    salt: str = "t5",
):
    """T5-style span-corruption mask assignment: partition each document's
    whitespace tokens into fixed ``block``-token blocks and mask block b of
    doc d iff ``md5('salt:d:b')`` (first 8 hex as uint32) % rate_mod == 0 —
    deterministic, non-overlapping by construction (block-level decisions
    need no greedy left-to-right resolution, keeping both the distributed
    pass and the SQL oracle closed-form).

    Returns (doc_id, span_start, span_end) token-index rows for every
    masked span (the final span clips to the doc's token count). Pure
    per-batch fan-out — one salted-prefix md5 per BLOCK (1/block of the
    token count), document text never shuffles.
    """
    import hashlib

    def f(b: pa.Table) -> pa.Table:
        # md5 objects don't pickle — build the salted prefix per batch
        pre = hashlib.md5(f"{salt}:".encode())
        cp = pre.copy
        ids = b.column(id_col).to_numpy()
        texts = b.column(text_col).to_pylist()
        out_d, out_s, out_e = [], [], []
        for i, t in zip(ids, texts):
            n = sum(1 for w in (t or "").split(" ") if w)
            nb = (n + block - 1) // block
            for bi in range(nb):
                h = cp()
                h.update(f"{int(i)}:{bi}".encode())
                if int(h.hexdigest()[:8], 16) % rate_mod == 0:
                    out_d.append(int(i))
                    out_s.append(bi * block)
                    out_e.append(min((bi + 1) * block, n))
        return pa.table(
            {
                "doc_id": pa.array(out_d, pa.int64()),
                "span_start": pa.array(out_s, pa.int64()),
                "span_end": pa.array(out_e, pa.int64()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


def make_page_html_anchors(
    doc_id: int, text: str, links: list[tuple[str, str]]
) -> bytes:
    """make_page_html plus a trailing ``<nav>`` of outlinks WITH anchor
    text — the fixture for anchor-text aggregation (anchor text is part
    of the body, so this variant is NOT under the byte-identical-text
    invariant; use make_page_html_links for that)."""
    body = "".join(f"<p>{escape_html_text(ln)}</p>" for ln in text.split("\n"))
    nav = "".join(
        f'<a href="{h}">{escape_html_text(a)}</a>' for h, a in links
    )
    return (
        f"<html><head><title>doc{doc_id}</title>"
        f'<script>var x="ignore me";</script></head>'
        f"<body>{body}<nav>{nav}</nav></body></html>"
    ).encode()
