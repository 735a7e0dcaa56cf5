"""Common-Crawl-style pages source (BASELINE.json input_hint schema:
url, warc_ts, html, text, lang).

No pages table exists in the driver testdata, so pages are synthesized
deterministically FROM the documents table (doc_id -> url, text -> html via
the frozen wrapper in stages.text). The html is built so the frozen extractor
inverts it exactly — giving the byte-identical-text-per-url invariant a
checkable ground truth (the original ``text`` column).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ..stages.text import make_page_html

EPOCH_2024 = 1704067200  # 2024-01-01T00:00:00Z, seconds


def pages_from_documents_batch(batch: pa.Table) -> pa.Table:
    """documents batch -> pages batch (url, warc_ts, html, text, lang,
    doc_id retained as the join key)."""
    ids = batch.column("doc_id").to_numpy()
    texts = batch.column("text").to_pylist()
    langs = batch.column("lang").to_pylist()
    urls = [f"https://site{int(i) % 1000:04d}.example/page/{int(i)}" for i in ids]
    ts = (EPOCH_2024 + ids.astype(np.int64)) * 1_000_000  # us
    htmls = [make_page_html(int(i), t or "") for i, t in zip(ids, texts)]
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )


def read_pages(sf_dir: str) -> "ray.data.Dataset":
    """Pages Dataset synthesized from {sf_dir}/documents.parquet."""
    # pruned read: page synthesis only consumes these three columns
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    return docs.map_batches(pages_from_documents_batch, batch_format="pyarrow")


def pdfs_from_documents_batch(batch: pa.Table) -> pa.Table:
    """documents batch -> crawled-PDF rows (doc_id, url, pdf binary, text):
    each document's text becomes a real one-page FlateDecode PDF
    (functions/pdf.py encode_simple_pdf), which the extractor inverts
    byte-exactly — the PDF-modality twin of the HTML pages fixture."""
    from ..functions.pdf import encode_simple_pdf

    ids = batch.column("doc_id").to_numpy()
    texts = batch.column("text").to_pylist()
    pdfs = [encode_simple_pdf([t or ""]) for t in texts]
    urls = [
        f"https://site{int(i) % 1000:04d}.example/doc/{int(i)}.pdf"
        for i in ids
    ]
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "url": pa.array(urls, pa.string()),
            "pdf": pa.array(pdfs, pa.binary()),
            "text": pa.array(texts, pa.string()),
        }
    )


def read_pdf_docs(sf_dir: str) -> "ray.data.Dataset":
    """Crawled-PDF Dataset synthesized from {sf_dir}/documents.parquet."""
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return docs.map_batches(pdfs_from_documents_batch, batch_format="pyarrow")


def page_url(doc_id: int) -> str:
    """The canonical page URL for a doc id (same format as read_pages)."""
    return f"https://site{int(doc_id) % 1000:04d}.example/page/{int(doc_id)}"


# Deterministic outlink rule for the linked-pages variant (FIXTURES.md):
# page i carries k_i = i % 4 anchors (0..3; k=0 pages are DANGLING nodes),
# anchor j (0 <= j < k_i) points at doc (i*7 + j*13 + 1) % n. Self-links
# are kept in the html (realistic) and dropped by the edge parser.
LINK_A, LINK_B, LINK_C, LINK_KMOD = 7, 13, 1, 4


def page_link_targets(ids: np.ndarray, n: int) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized (src, dst) anchor targets for the linked-pages rule,
    INCLUDING self-links, in per-page anchor order j = 0..k_i-1."""
    ids = np.asarray(ids, dtype=np.int64)
    k = ids % LINK_KMOD
    src = np.repeat(ids, k)
    j = np.arange(len(src), dtype=np.int64) - np.repeat(
        np.cumsum(k) - k, k
    )  # 0..k_i-1 within each page
    dst = (src * LINK_A + j * LINK_B + LINK_C) % n
    return src, dst


def linked_pages_from_documents_batch(batch: pa.Table, n: int) -> pa.Table:
    """Like pages_from_documents_batch but the html body ends with a
    ``<nav>`` of anchor tags following the outlink rule. Anchor text is
    empty, so the frozen extractor still inverts the page to ``text``
    exactly (tags strip to nothing) — the byte-identical-text invariant
    holds for linked pages too (tested)."""
    from ..stages.text import make_page_html_links

    ids = batch.column("doc_id").to_numpy()
    texts = batch.column("text").to_pylist()
    langs = batch.column("lang").to_pylist()
    src, dst = page_link_targets(ids, n)
    k = ids.astype(np.int64) % LINK_KMOD
    ends = np.cumsum(k)
    starts = ends - k
    htmls = []
    for row, (i, t) in enumerate(zip(ids, texts)):
        hrefs = [page_url(d) for d in dst[starts[row] : ends[row]]]
        htmls.append(make_page_html_links(int(i), t or "", hrefs))
    urls = [page_url(int(i)) for i in ids]
    ts = (EPOCH_2024 + ids.astype(np.int64)) * 1_000_000
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )


def read_linked_pages(sf_dir: str) -> "ray.data.Dataset":
    """Pages Dataset with deterministic outlink anchors in the html."""
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    n = docs.count()  # parquet metadata count, no scan
    return docs.map_batches(
        linked_pages_from_documents_batch, batch_format="pyarrow", fn_kwargs={"n": n}
    )


def anchor_text_for(dst: int) -> str:
    """Deterministic anchor text for a link to doc ``dst`` — arithmetic
    so the SQL oracle derives the same tokens."""
    return f"ref {int(dst) % 97} page {int(dst)}"


def anchored_pages_from_documents_batch(batch: pa.Table, n: int) -> pa.Table:
    """linked_pages_from_documents_batch with REAL anchor text per link
    (anchor_text_for rule)."""
    from ..stages.text import make_page_html_anchors

    ids = batch.column("doc_id").to_numpy()
    texts = batch.column("text").to_pylist()
    langs = batch.column("lang").to_pylist()
    src, dst = page_link_targets(ids, n)
    k = ids.astype(np.int64) % LINK_KMOD
    ends = np.cumsum(k)
    starts = ends - k
    htmls = []
    for row, (i, t) in enumerate(zip(ids, texts)):
        links = [
            (page_url(d), anchor_text_for(d))
            for d in dst[starts[row] : ends[row]]
        ]
        htmls.append(make_page_html_anchors(int(i), t or "", links))
    urls = [page_url(int(i)) for i in ids]
    ts = (EPOCH_2024 + ids.astype(np.int64)) * 1_000_000
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )


def read_anchored_pages(sf_dir: str) -> "ray.data.Dataset":
    """Pages Dataset whose outlink anchors carry deterministic anchor
    TEXT (the Common-Crawl anchor-text-dataset fixture)."""
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    n = docs.count()
    return docs.map_batches(
        anchored_pages_from_documents_batch,
        batch_format="pyarrow",
        fn_kwargs={"n": n},
    )


# Deterministic robots.txt fixture (FIXTURES.md): site s publishes a robots
# file whose `*` group disallows the path prefix /page/<a> but re-allows the
# longer prefix /page/<a><b>, with a = s % 10 and b = (s // 10) % 10 — so a
# page is BLOCKED for a `*`-matched agent iff str(doc_id) starts with
# str(a) and NOT with str(a)+str(b) (longest-match, allow-wins). A decoy
# `megacrawler` group disallowing everything exercises group selection.
def make_robots_txt(site: int) -> bytes:
    a = site % 10
    b = (site // 10) % 10
    return (
        f"# robots for site{site:04d}.example\n"
        f"User-agent: megacrawler\n"
        f"Disallow: /\n"
        f"\n"
        f"User-agent: *\n"
        f"Disallow: /page/{a}\n"
        f"Allow: /page/{a}{b}\n"
        f"Crawl-delay: 2\n"
        f"\n"
        f"Sitemap: https://site{site:04d}.example/sitemap.xml\n"
    ).encode()


def read_robots(num_sites: int = 1000) -> "ray.data.Dataset":
    """Dataset of (host, robots_txt) rows for every fixture site."""

    def mk(b: pa.Table) -> pa.Table:
        ids = b.column("id").to_numpy()
        hosts = [f"site{int(s):04d}.example" for s in ids]
        bodies = [make_robots_txt(int(s)) for s in ids]
        return pa.table(
            {
                "host": pa.array(hosts, pa.string()),
                "robots_txt": pa.array(bodies, pa.binary()),
            }
        )

    return ray.data.range(num_sites).map_batches(mk, batch_format="pyarrow")
