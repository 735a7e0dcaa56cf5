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


def extract_text_batch(batch: pa.Table, html_col: str = "html") -> pa.Table:
    htmls = batch.column(html_col).to_pylist()
    texts = [extract_text_bytes(h) for h in htmls]
    return batch.append_column("extracted_text", pa.array(texts, type=pa.string()))


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


def rolling_fingerprint_batch(
    batch: pa.Table, text_col: str = "text", window: int = 8
) -> pa.Table:
    """Winnowing-style document fingerprint: min rolling hash over word
    ``window``-grams (deterministic polynomial hash, no Python hash())."""
    texts = batch.column(text_col).to_pylist()
    fps = np.empty(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts):
        toks = (t or "").split(" ")
        if len(toks) < window:
            grams = [" ".join(toks)]
        else:
            grams = [" ".join(toks[j : j + window]) for j in range(len(toks) - window + 1)]
        best = _ROLL_P
        for g in grams:
            h = 0
            for ch in g.encode():
                h = (h * _ROLL_B + ch) % _ROLL_P
            if h < best:
                best = h
        fps[i] = best
    return batch.append_column("doc_fp", pa.array(fps, type=pa.uint64()))
