"""Web-page URL operators over the Common-Crawl-style pages schema
(BASELINE.json input_hint: url, warc_ts, html, text, lang).

Domain extraction is a pure string parse (scheme://HOST/...); per-domain
aggregation is the standard combiner shape — per-batch partial (domain,
count, chars) rows collapse each block to its distinct domains BEFORE the
shuffle, then a native vectorized groupby-sum finishes. Web corpora are
domain-skewed; the partial combine means a hot domain costs one row per
block, not one per page.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def extract_domain_batch(batch: pa.Table, url_col: str = "url") -> pa.Table:
    """Append ``domain`` = the host part of the URL (text between the
    scheme's '//' and the next '/'; ports/userinfo kept verbatim)."""
    urls = batch.column(url_col).to_pylist()
    doms = []
    for u in urls:
        u = u or ""
        i = u.find("//")
        rest = u[i + 2 :] if i >= 0 else u
        j = rest.find("/")
        doms.append(rest[:j] if j >= 0 else rest)
    return batch.append_column("domain", pa.array(doms, pa.string()))


def domain_stats(ds, url_col: str = "url", text_col: str = "text"):
    """Per-domain page count and total extracted-text characters.

    Returns a Dataset of (domain, n_pages, total_chars)."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        t = extract_domain_batch(b, url_col)
        doms = np.asarray(t.column("domain").to_pylist(), dtype=object)
        chars = np.fromiter(
            (len(x or "") for x in t.column(text_col).to_pylist()),
            dtype=np.int64,
            count=len(doms),
        )
        uniq, inv = np.unique(doms, return_inverse=True)
        n = np.bincount(inv).astype(np.int64)
        c = np.bincount(inv, weights=chars).astype(np.int64)
        return pa.table(
            {
                "domain": pa.array(list(uniq), pa.string()),
                "n_pages": pa.array(n, pa.int64()),
                "total_chars": pa.array(c, pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("domain")
        .aggregate(
            Sum("n_pages", alias_name="n_pages"),
            Sum("total_chars", alias_name="total_chars"),
        )
    )
