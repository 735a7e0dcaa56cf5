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
