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


_UTM_MID = r"utm_[a-z]+=[^&#]*&"  # tracking param followed by another param
_UTM_LAST = r"[?&]utm_[a-z]+=[^&#]*$"  # tracking param at the end of the query
_SCHEME_HOST = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"


def canonicalize_url_batch(
    batch: pa.Table, url_col: str = "url", out_col: str = "canonical_url"
) -> pa.Table:
    """Append the canonical form of each URL — the normalization a crawl
    dedup runs before keying (cf. crawler frontier normalization; the rule
    set here is fixed and documented so the oracle can mirror it):

    1. drop the ``#fragment``;
    2. drop ``utm_*`` tracking query parameters (other params keep their
       original order); a now-empty query loses its ``?``;
    3. lowercase the scheme and host (path/query case is significant and
       kept);
    4. drop the default port (``:443`` for https, ``:80`` for http);
    5. drop one trailing slash.

    Fully vectorized Arrow RE2 kernels (DuckDB's regexp_replace is also RE2
    with identical leftmost/global semantics, so the oracle is bit-exact —
    same trick as stages.text PII redaction)."""
    import pyarrow.compute as pc

    u = batch.column(url_col)
    u = pc.replace_substring_regex(u, pattern=r"#.*$", replacement="")
    u = pc.replace_substring_regex(u, pattern=_UTM_MID, replacement="")
    u = pc.replace_substring_regex(u, pattern=_UTM_LAST, replacement="")
    # split scheme://host[:port] off, lowercase it, strip the default port
    sh = pc.extract_regex(u, pattern=f"(?P<sh>{_SCHEME_HOST})")
    sh = pc.utf8_lower(pc.struct_field(sh, "sh"))
    sh = pc.replace_substring_regex(
        sh, pattern=r"^(https://[^/?#]*):443$", replacement=r"\1"
    )
    sh = pc.replace_substring_regex(
        sh, pattern=r"^(http://[^/?#]*):80$", replacement=r"\1"
    )
    rest = pc.replace_substring_regex(u, pattern=_SCHEME_HOST, replacement="")
    u = pc.binary_join_element_wise(sh, rest, "")
    u = pc.replace_substring_regex(u, pattern=r"/$", replacement="")
    return batch.append_column(out_col, u)


def url_dedup(
    ds,
    url_col: str = "url",
    id_col: str = "doc_id",
    ts_col: str = "fetch_ts",
):
    """URL-level dedup after canonicalization: one keeper per canonical URL —
    the LATEST fetch wins (max ts, ties to the smallest id), the classic
    recrawl-collapse rule.

    Same 100-TB shape as :func:`~..dedup.exact_dedup`: a per-block PARTIAL
    (canonical_url, best_ts, best_id, count) row per distinct URL leaves the
    map stage — page bodies never shuffle — then 256 coarse md5-prefix
    groups finalize with vectorized pandas groupbys (no per-URL Python
    call). Returns (canonical_url, keeper_doc_id, last_ts, n_urls).
    """
    import hashlib

    ncoarse = 256

    def partial(b: pa.Table) -> pa.Table:
        t = canonicalize_url_batch(b, url_col)
        df = pd.DataFrame(
            {
                "canonical_url": t.column("canonical_url").to_pylist(),
                "_id": t.column(id_col).to_numpy(),
                "_ts": t.column(ts_col).to_numpy(),
            }
        )
        # best row per URL inside the block: max ts, then min id — a sort
        # then first() keeps the argmax pair together (vectorized)
        df = df.sort_values(["canonical_url", "_ts", "_id"],
                            ascending=[True, False, True])
        agg = df.groupby("canonical_url", as_index=False).agg(
            last_ts=("_ts", "first"),
            keeper_doc_id=("_id", "first"),
            n_urls=("_id", "size"),
        )
        ck = np.array(
            [
                int(hashlib.md5(s.encode()).hexdigest()[:4], 16) % ncoarse
                for s in agg["canonical_url"]
            ],
            dtype=np.int64,
        )
        return pa.table(
            {
                "canonical_url": pa.array(agg["canonical_url"], pa.string()),
                "last_ts": pa.array(agg["last_ts"].to_numpy(np.int64)),
                "keeper_doc_id": pa.array(
                    agg["keeper_doc_id"].to_numpy(np.int64)
                ),
                "n_urls": pa.array(agg["n_urls"].to_numpy(np.int64)),
                "ckey": pa.array(ck, pa.int64()),
            }
        )

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["canonical_url", "last_ts", "keeper_doc_id"],
            ascending=[True, False, True],
        )
        out = g.groupby("canonical_url", as_index=False).agg(
            keeper_doc_id=("keeper_doc_id", "first"),
            last_ts=("last_ts", "first"),
            n_urls=("n_urls", "sum"),
        )
        return out.astype(
            {"keeper_doc_id": np.int64, "last_ts": np.int64,
             "n_urls": np.int64}
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("ckey")
        .map_groups(finalize, batch_format="pandas")
    )


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


def snapshot_diff(
    old,
    new,
    key_col: str = "key",
    hash_col: str = "h",
    num_coarse_groups: int = 64,
):
    """Diff two crawl snapshots by key: FULL-OUTER-JOIN semantics without a
    join. Returns (key_col, status) with status in
    {added, removed, changed, unchanged}.

    Both sides are tagged and unioned, then ONE shuffle into a fixed number
    of coarse key-hash groups classifies every key vectorized (a key's two
    rows always land in the same coarse group). Keys must be unique within
    each snapshot. The corpus content never moves — callers pass
    (key, content_hash) projections, so the exchange is ~50 B/row however
    large the pages are.
    """
    import hashlib

    def _tag(side: int):
        def f(b: pa.Table) -> pa.Table:
            keys = b.column(key_col).to_pylist()
            cg = np.fromiter(
                (
                    int.from_bytes(
                        hashlib.md5(str(k).encode()).digest()[:8], "big"
                    )
                    % num_coarse_groups
                    for k in keys
                ),
                dtype=np.int64,
                count=len(keys),
            )
            return pa.table(
                {
                    key_col: b.column(key_col),
                    "__h": b.column(hash_col),
                    "__side": pa.array(
                        np.full(len(keys), side, np.int64), pa.int64()
                    ),
                    "__cg": pa.array(cg, pa.int64()),
                }
            )

        return f

    def classify(b: pa.Table) -> pa.Table:
        k = b.column(key_col).to_numpy(zero_copy_only=False)
        h = np.asarray(b.column("__h").to_pylist(), dtype=object)
        side = b.column("__side").to_numpy()
        uniq, inv = np.unique(k, return_inverse=True)
        oh = np.full(len(uniq), None, dtype=object)
        nh = np.full(len(uniq), None, dtype=object)
        oh[inv[side == 0]] = h[side == 0]
        nh[inv[side == 1]] = h[side == 1]
        status = np.where(
            np.equal(oh, None),
            "added",
            np.where(
                np.equal(nh, None),
                "removed",
                np.where(oh != nh, "changed", "unchanged"),
            ),
        )
        return pa.table(
            {
                key_col: pa.array(uniq),
                "status": pa.array(status.astype(str), pa.string()),
            }
        )

    tagged = old.map_batches(_tag(0), batch_format="pyarrow").union(
        new.map_batches(_tag(1), batch_format="pyarrow")
    )
    return tagged.groupby("__cg").map_groups(classify, batch_format="pyarrow")


# ---------------- outlink extraction / link-graph construction ----------------

import re as _re

# href parse: anchor tags only, double-quoted value (the crawl-frozen rule —
# documented so the oracle fixture derivation is exact)
_HREF_RE = _re.compile(rb'<a\s[^>]*?href="([^"]*)"')


def extract_links_batch(
    batch: pa.Table,
    html_col: str = "html",
    id_col: str = "doc_id",
    url_col: str = "url",
    drop_self: bool = True,
) -> pa.Table:
    """Parse every ``<a href="...">`` out of the raw html bytes.

    Emits one (src_doc, href) row per anchor, page order preserved. Pure
    per-batch fan-out — the html column never leaves the task; only the
    ~60-byte href strings do. ``drop_self`` removes anchors pointing at the
    page's own URL before anything ships (cheaper than a post-join filter).
    """
    htmls = batch.column(html_col).to_pylist()
    ids = batch.column(id_col).to_numpy()
    own = batch.column(url_col).to_pylist()
    src: list[int] = []
    hrefs: list[bytes] = []
    for i, h, u in zip(ids, htmls, own):
        ub = (u or "").encode()
        for m in _HREF_RE.findall(h or b""):
            if drop_self and m == ub:
                continue
            src.append(int(i))
            hrefs.append(m)
    return pa.table(
        {
            "src_doc": pa.array(src, pa.int64()),
            "href": pa.array([b.decode("utf-8", "replace") for b in hrefs], pa.string()),
        }
    )


def link_edges(pages, num_partitions: int = 8, coarse: int = 256):
    """(src_doc, href, dst_doc) edge Dataset from a pages Dataset: parse
    anchors, then resolve href -> dst doc id with a DISTRIBUTED hash join
    against the (url, doc_id) projection of the same pages stream.

    The join is the honest 100-TB shape: the url->id map is corpus-sized
    (one row per page) so it cannot be broadcast; both sides hash-exchange
    on the url string. Physically it is a tagged union + coarse-keyed
    cogroup with a vectorized pandas merge per group (robust where
    ``Dataset.join`` loses the key schema when one side is empty — a
    no-anchor corpus is legal). Anchors pointing outside the corpus drop
    out of the inner merge (a crawl's frontier discovers those
    separately). ``num_partitions`` kept for API compatibility.
    """
    import hashlib

    links = pages.map_batches(extract_links_batch, batch_format="pyarrow")

    def _ckeys(strs) -> np.ndarray:
        return np.fromiter(
            (
                int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")
                % coarse
                for s in strs
            ),
            np.int64,
            len(strs),
        )

    def tag_links(b: pa.Table) -> pa.Table:
        hrefs = b.column("href").to_pylist()
        n = len(hrefs)
        return pa.table(
            {
                "href": b.column("href"),
                "src_doc": b.column("src_doc").cast(pa.int64()),
                "dst_doc": pa.array(np.zeros(n, np.int64), pa.int64()),
                "side": pa.array(np.zeros(n, np.int8), pa.int8()),
                "ckey": pa.array(_ckeys(hrefs), pa.int64()),
            }
        )

    def tag_urls(b: pa.Table) -> pa.Table:
        urls = b.column("url").to_pylist()
        n = len(urls)
        return pa.table(
            {
                "href": b.column("url"),
                "src_doc": pa.array(np.zeros(n, np.int64), pa.int64()),
                "dst_doc": b.column("doc_id").cast(pa.int64()),
                "side": pa.array(np.ones(n, np.int8), pa.int8()),
                "ckey": pa.array(_ckeys(urls), pa.int64()),
            }
        )

    tagged = links.map_batches(tag_links, batch_format="pyarrow").union(
        pages.map_batches(tag_urls, batch_format="pyarrow")
    )

    def match(g: pd.DataFrame) -> pd.DataFrame:
        lm = g["side"].to_numpy() == 0
        left = g.loc[lm, ["src_doc", "href"]]
        right = g.loc[~lm, ["href", "dst_doc"]]
        if left.empty or right.empty:
            return pd.DataFrame(
                {
                    "src_doc": pd.Series([], dtype=np.int64),
                    "href": pd.Series([], dtype=object),
                    "dst_doc": pd.Series([], dtype=np.int64),
                }
            )
        out = left.merge(right, on="href", how="inner")
        return out[["src_doc", "href", "dst_doc"]]

    return tagged.groupby("ckey").map_groups(match, batch_format="pandas")


def crawl_frontier(pages, coarse: int = 256):
    """(href, n_refs) for every anchor target NOT present in the corpus —
    the crawl FRONTIER (what gets scheduled next). The anti-join side of
    link_edges' url-resolve cogroup: hrefs hash-exchange with the url set
    on the same coarse key; per group, in-corpus hrefs drop and the rest
    aggregate to (href, count). The href grouping inside one coarse group
    is GLOBAL for that href (its hash puts every reference in the same
    group), so per-group counts are final — no second shuffle.
    """
    import hashlib

    links = pages.map_batches(extract_links_batch, batch_format="pyarrow")

    def _ckeys(strs) -> np.ndarray:
        return np.fromiter(
            (
                int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")
                % coarse
                for s in strs
            ),
            np.int64,
            len(strs),
        )

    def tag_links(b: pa.Table) -> pa.Table:
        hrefs = b.column("href").to_pylist()
        n = len(hrefs)
        return pa.table(
            {
                "href": b.column("href"),
                "side": pa.array(np.zeros(n, np.int8), pa.int8()),
                "ckey": pa.array(_ckeys(hrefs), pa.int64()),
            }
        )

    def tag_urls(b: pa.Table) -> pa.Table:
        urls = b.column("url").to_pylist()
        n = len(urls)
        return pa.table(
            {
                "href": b.column("url"),
                "side": pa.array(np.ones(n, np.int8), pa.int8()),
                "ckey": pa.array(_ckeys(urls), pa.int64()),
            }
        )

    tagged = links.map_batches(tag_links, batch_format="pyarrow").union(
        pages.map_batches(tag_urls, batch_format="pyarrow")
    )

    def anti(g: pd.DataFrame) -> pd.DataFrame:
        side = g["side"].to_numpy()
        known = set(g.loc[side == 1, "href"])
        ext = g.loc[side == 0, "href"]
        ext = ext[~ext.isin(known)]
        if ext.empty:
            return pd.DataFrame(
                {
                    "href": pd.Series([], dtype=object),
                    "n_refs": pd.Series([], dtype=np.int64),
                }
            )
        out = ext.value_counts().rename_axis("href").reset_index(name="n_refs")
        out["n_refs"] = out["n_refs"].astype(np.int64)
        return out[["href", "n_refs"]]

    return tagged.groupby("ckey").map_groups(anti, batch_format="pandas")


def upsert_merge(
    base,
    updates,
    key_col: str = "key",
    version_col: str = "version",
):
    """CDC compaction / upsert MERGE: union base and updates, keep exactly
    one row per key — the highest ``version``; on a version tie the
    UPDATES side wins (the Delta/Iceberg latest-wins rule). Keys unique
    within each input. All payload columns pass through.

    Scale shape: both inputs stream through a per-block pre-compaction
    (vectorized lexsort keeps only each key's local winner, so a block
    contributes at most one row per distinct key it holds), then ONE
    key-hash shuffle co-locates the survivors and the same vectorized
    pick runs per partition. Payload moves at most once; the winner pick
    never runs Python per row."""

    def _tag(side: int):
        def f(b: pa.Table) -> pa.Table:
            return b.append_column(
                "__side",
                pa.array(np.full(b.num_rows, side, np.int64), pa.int64()),
            )

        return f

    def _compact(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        k = b.column(key_col).to_numpy(zero_copy_only=False)
        v = b.column(version_col).to_numpy()
        s = b.column("__side").to_numpy()
        # ascending (key, version, side): the LAST row of each key group
        # is its winner
        order = np.lexsort((s, v, k))
        kk = k[order]
        last = np.ones(len(kk), dtype=bool)
        last[:-1] = kk[1:] != kk[:-1]
        return b.take(pa.array(order[last], pa.int64()))

    ncoarse = 256

    def _coarse(b: pa.Table) -> pa.Table:
        import hashlib

        keys = b.column(key_col).to_pylist()
        cg = np.fromiter(
            (
                int.from_bytes(
                    hashlib.md5(str(k).encode()).digest()[:8], "big"
                )
                % ncoarse
                for k in keys
            ),
            dtype=np.int64,
            count=len(keys),
        )
        return b.append_column("__cg", pa.array(cg, pa.int64()))

    tagged = base.map_batches(_tag(0), batch_format="pyarrow").union(
        updates.map_batches(_tag(1), batch_format="pyarrow")
    )
    pre = tagged.map_batches(_compact, batch_format="pyarrow").map_batches(
        _coarse, batch_format="pyarrow"
    )

    # ONE coarse-keyed cogroup (a key's rows all share __cg), vectorized
    # winner pick per group — never one interpreter call per key
    def _finalize(g):
        t = _compact(pa.Table.from_pandas(g, preserve_index=False))
        return t.drop_columns(["__side", "__cg"]).to_pandas()

    return pre.groupby("__cg").map_groups(_finalize, batch_format="pandas")


_ANCHOR_RE = _re.compile(rb'<a href="([^"]+)">([^<]*)</a>')


def anchor_text_topk(pages, k: int = 3, html_col: str = "html"):
    """Per-target anchor-text aggregation — the Common-Crawl anchor-text
    dataset shape (anchor tokens pointing AT a url are a relevance signal
    for that url). Three stages, html never leaves its task:

    1. per-batch: parse ``<a href>anchor</a>`` pairs, tokenize anchors,
       collapse to (href, token, cnt) partials (Counter per batch);
    2. native multi-key ``groupby(["href", "token"]).sum``;
    3. exact distributed top-k per href ordered (cnt DESC, token ASC)
       (stages/rank.py partial-combiner shape).

    Returns (href, token, cnt, rnk<=k).
    """
    from collections import Counter

    from .rank import top_k_per_group

    def partial(b: pa.Table) -> pa.Table:
        htmls = b.column(html_col).to_pylist()
        c = Counter()
        for h in htmls:
            for href, anchor in _ANCHOR_RE.findall(h or b""):
                for tok in anchor.decode("utf-8", "replace").split(" "):
                    if tok:
                        c[(href.decode(), tok)] += 1
        hrefs = [h for h, _ in c]
        toks = [t for _, t in c]
        return pa.table(
            {
                "href": pa.array(hrefs, pa.string()),
                "token": pa.array(toks, pa.string()),
                "cnt": pa.array(
                    np.fromiter(c.values(), np.int64, len(c)), pa.int64()
                ),
            }
        )

    parts = pages.map_batches(partial, batch_format="pyarrow")
    counts = parts.groupby(["href", "token"]).sum("cnt")
    counts = counts.map_batches(
        lambda b: b.rename_columns(["href", "token", "cnt"]),
        batch_format="pyarrow",
    )
    return top_k_per_group(counts, "href", "cnt", k, tie_col="token")
