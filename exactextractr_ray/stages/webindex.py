"""Web-archive indexing operators: SURT canonicalization, CDX capture
index construction, robots.txt (RFC 9309) gating, and posting-list
(inverted) index building.

These are graft-side Common-Crawl ingestion operators — the reference
engine (isciences/exactextractr) has no web surface; the shapes follow the
public CDX(J) index layout (surt-sorted capture keys pointing at
(warc file, offset, length)), the robots-exclusion protocol (RFC 9309 +
Google's longest-match/allow-wins precedence), and the classic IR
delta-encoded posting list.

Scale shapes (100 TB contract):

* ``build_cdx``: the html payload NEVER shuffles — one ``map_batches``
  pass reduces each capture to an index row (surt, ts, digest, length,
  shard), per-shard byte offsets come from a ``groupby(shard)`` whose
  group size is one WARC file's worth of index rows (the same parallel
  unit as the crawl itself), and the final ``sort("surt")`` moves index
  rows only (~100 bytes each, ~10^-4 of the corpus bytes) into the
  range-partitioned order the CDX format is defined by.
* ``apply_robots``: rules live one-per-registered-domain (~30M rows at
  crawl scale — NOT broadcastable), so the gate is a coarse-group hash
  JOIN on host: pages are projected to (doc_id, url, host, path) before
  the exchange; rule matching inside each group is vectorized per rule
  (rules-per-host is small and bounded by the robots.txt size cap).
* ``build_postings``: two-level segmented assembly. Stopword-grade terms
  (df ≈ corpus size) would make a single ``groupby(term)`` group hold the
  whole posting list; instead stage 1 groups on (term, doc_id >> seg_bits)
  — bounded segments — and stage 2 stitches per-SEGMENT summary rows
  (tiny) per term. The encoded posting blob stays segmented, which is how
  production indexes store hot terms anyway.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

# ---------------------------------------------------------------- SURT

_WWW_RE = re.compile(r"^www\d*\.")


def surt(url: str) -> str:
    """Sort-friendly URI Reordering Transform of ``url``.

    Canonicalization (documented contract; the pywb/CC flavor):
    scheme and userinfo dropped; host lowercased, leading ``www\\d*.``
    stripped, labels reversed and comma-joined; default ports (80/443)
    dropped, other ports kept as ``host:port``; fragment dropped; query
    parameters sorted bytewise and lowercased; path lowercased. The key is
    ``rev-host[:port])/path[?sorted-query]``.
    """
    u = url
    i = u.find("://")
    if i >= 0:
        u = u[i + 3 :]
    host, sep, rest = u.partition("/")
    path = "/" + rest if sep else "/"
    path = path.split("#", 1)[0]
    if "@" in host:
        host = host.rsplit("@", 1)[1]
    host = host.lower()
    port = ""
    if ":" in host:
        host, _, p = host.rpartition(":")
        if p not in ("", "80", "443"):
            port = ":" + p
    host = _WWW_RE.sub("", host)
    if "?" in path:
        path, _, q = path.partition("?")
        q = "&".join(sorted(q.lower().split("&")))
        path = path + "?" + q
    return ",".join(reversed(host.split("."))) + port + ")" + path.lower()


def surt_batch(urls: list[str]) -> list[str]:
    return [surt(u) for u in urls]


# ------------------------------------------------------------- CDX index

#: WARC record overhead constants mirroring sources/warc.py:write_warc
#: byte-for-byte (verified against real write_warc output in
#: tests/test_webindex.py). The HTTP envelope adds _HTTP_OVERHEAD bytes to
#: the payload; the WARC header adds _WARC_FIXED + len(url) + len(date) +
#: len(str(content_length)) and the record ends with CRLF CRLF.
_HTTP_OVERHEAD = len(b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n")
_WARC_FIXED = (
    len(b"WARC/1.0\r\n")
    + len(b"WARC-Type: response\r\n")
    + len(b"WARC-Target-URI: \r\n")
    + len(b"WARC-Date: \r\n")
    + len(b"Content-Length: \r\n")
    + len(b"Content-Type: application/http; msgtype=response\r\n")
    + len(b"\r\n")
    + len(b"\r\n\r\n")
)


def warc_record_length(url: str, warc_date: str, payload_len: int) -> int:
    """Exact on-disk length of one uncompressed write_warc response record."""
    clen = _HTTP_OVERHEAD + payload_len
    return _WARC_FIXED + len(url) + len(warc_date) + len(str(clen)) + clen


def _cdx_partial(num_shards: int):
    def f(b: pa.Table) -> pa.Table:
        urls = b.column("url").to_pylist()
        htmls = b.column("html").to_pylist()
        # cast to second precision: Arrow's %S renders subseconds for
        # us-precision timestamps
        ts = pc.cast(b.column("warc_ts"), pa.timestamp("s"))
        ids = b.column("doc_id").to_numpy()
        ts14 = pc.strftime(ts, format="%Y%m%d%H%M%S").to_pylist()
        dates = pc.strftime(ts, format="%Y-%m-%dT%H:%M:%SZ").to_pylist()
        digests = [hashlib.md5(h).hexdigest() for h in htmls]
        lens = [
            warc_record_length(u, d, len(h))
            for u, d, h in zip(urls, dates, htmls)
        ]
        shard = (ids % num_shards).astype(np.int64)
        return pa.table(
            {
                "surt": pa.array(surt_batch(urls), pa.string()),
                "ts14": pa.array(ts14, pa.string()),
                "url": pa.array(urls, pa.string()),
                "digest": pa.array(digests, pa.string()),
                "rec_len": pa.array(lens, pa.int64()),
                "shard": pa.array(shard, pa.int64()),
            }
        )

    return f


def _cdx_offsets(g: pd.DataFrame) -> pd.DataFrame:
    """One group = one shard's WARC file: records in capture order
    (ts14, url), offset = running byte position."""
    g = g.sort_values(["ts14", "url"], kind="mergesort").reset_index(drop=True)
    g["offset"] = g["rec_len"].cumsum().shift(fill_value=0).astype(np.int64)
    g["filename"] = [f"crawl/warc-{int(s):05d}.warc" for s in g["shard"]]
    return g


def build_cdx(pages, num_shards: int = 8):
    """CDX capture index over a pages Dataset (url, warc_ts, html, doc_id).

    Returns a Dataset sorted by surt with columns (surt, ts14, url, digest,
    rec_len, shard, offset, filename); offsets are exact byte positions of
    each record in its shard's write_warc file (capture order ts,url).
    In production the shard is the source WARC file id; the fixture assigns
    ``doc_id % num_shards``.
    """
    rows = pages.map_batches(_cdx_partial(num_shards), batch_format="pyarrow")
    idx = rows.groupby("shard").map_groups(_cdx_offsets, batch_format="pandas")
    return idx.sort("surt")


# ----------------------------------------------------------- robots.txt

_RULE_WILD = re.compile(r"[*$]")


def parse_robots(content: bytes | str, agent: str) -> dict:
    """Parse a robots.txt per RFC 9309 for the given user-agent.

    Group selection: the most specific matching ``User-agent`` group wins
    (longest agent token that is a case-insensitive substring match of
    ``agent``); the ``*`` group is the fallback. Returns
    ``{"rules": [(pattern, allow: bool), ...], "sitemaps": [...],
    "crawl_delay": float | None}``. Unknown fields ignored; comments
    (#) stripped; blank lines end a group only between agent lines.
    """
    if isinstance(content, bytes):
        content = content.decode("utf-8", errors="replace")
    agent_l = agent.lower()
    groups: list[tuple[list[str], list, float | None]] = []
    sitemaps: list[str] = []
    cur_agents: list[str] = []
    cur_rules: list = []
    cur_delay: float | None = None
    in_agents = True  # collecting consecutive User-agent lines

    def flush():
        nonlocal cur_agents, cur_rules, cur_delay
        if cur_agents:
            groups.append((cur_agents, cur_rules, cur_delay))
        cur_agents, cur_rules, cur_delay = [], [], None

    for raw in content.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "sitemap":
            sitemaps.append(value)
            continue
        if field == "user-agent":
            if not in_agents:
                flush()
                in_agents = True
            cur_agents.append(value.lower())
            continue
        in_agents = False
        if field in ("allow", "disallow"):
            if value or field == "disallow":
                # empty Disallow means "allow all" (no rule); empty Allow
                # is meaningless — both recorded only when non-empty
                if value:
                    cur_rules.append((value, field == "allow"))
        elif field == "crawl-delay":
            try:
                cur_delay = float(value)
            except ValueError:
                pass
    flush()

    best: tuple[int, list, float | None] | None = None
    for agents, rules, delay in groups:
        for a in agents:
            if a == "*":
                score = 0
            elif a in agent_l:
                score = 1 + len(a)
            else:
                continue
            if best is None or score > best[0]:
                best = (score, rules, delay)
    if best is None:
        return {"rules": [], "sitemaps": sitemaps, "crawl_delay": None}
    return {"rules": best[1], "sitemaps": sitemaps, "crawl_delay": best[2]}


def _rule_regex(pattern: str) -> re.Pattern:
    """robots path pattern -> anchored regex (* = any run, $ = end)."""
    out = []
    for part in re.split(r"(\*|\$$)", pattern):
        if part == "*":
            out.append(".*")
        elif part == "$":
            out.append("$")
        else:
            out.append(re.escape(part))
    return re.compile("^" + "".join(out))


def robots_allowed(rules: list[tuple[str, bool]], path: str) -> bool:
    """Longest-match precedence; Allow wins length ties; no match = allowed."""
    best_len = -1
    best_allow = True
    for pattern, allow in rules:
        if _RULE_WILD.search(pattern):
            hit = _rule_regex(pattern).match(path) is not None
        else:
            hit = path.startswith(pattern)
        if not hit:
            continue
        plen = len(pattern)
        if plen > best_len or (plen == best_len and allow and not best_allow):
            best_len, best_allow = plen, allow
    return best_allow


def _host_of(url: str) -> str:
    u = url
    i = u.find("://")
    if i >= 0:
        u = u[i + 3 :]
    host = u.partition("/")[0]
    if "@" in host:
        host = host.rsplit("@", 1)[1]
    return host.lower().rsplit(":", 1)[0] if ":" in host else host.lower()


def _path_of(url: str) -> str:
    u = url
    i = u.find("://")
    if i >= 0:
        u = u[i + 3 :]
    _, sep, rest = u.partition("/")
    return ("/" + rest if sep else "/").split("#", 1)[0]


def apply_robots(pages, robots, agent: str = "ccbot", coarse: int = 256):
    """Gate a pages Dataset by per-host robots.txt rules.

    ``robots`` is a Dataset of (host, robots_txt binary). Distributed as a
    coarse-group hash join on host (rules are domain-cardinality — NOT
    broadcastable at crawl scale): pages are projected to
    (doc_id, url, host, path) before the exchange; html never moves.
    Returns (doc_id, url, allowed int64).
    """

    def _ckey(hosts) -> np.ndarray:
        return np.array(
            [
                int.from_bytes(hashlib.md5(h.encode()).digest()[:4], "big")
                % coarse
                for h in hosts
            ],
            dtype=np.int64,
        )

    def tag_pages(b: pa.Table) -> pa.Table:
        urls = b.column("url").to_pylist()
        hosts = [_host_of(u) for u in urls]
        paths = [_path_of(u) for u in urls]
        return pa.table(
            {
                "ck": pa.array(_ckey(hosts), pa.int64()),
                "side": pa.array(np.zeros(len(urls), np.int8), pa.int8()),
                "host": pa.array(hosts, pa.string()),
                "doc_id": b.column("doc_id"),
                "url": pa.array(urls, pa.string()),
                "path": pa.array(paths, pa.string()),
                "rules": pa.array([None] * len(urls), pa.binary()),
            }
        )

    def tag_rules(b: pa.Table) -> pa.Table:
        hosts = b.column("host").to_pylist()
        bodies = b.column("robots_txt").to_pylist()
        # parse once per robots file, serialize the agent's rule list as
        # newline-framed "A|pattern" / "D|pattern" (patterns are paths —
        # never contain newlines)
        blobs = []
        for body in bodies:
            parsed = parse_robots(body, agent)
            blobs.append(
                "\n".join(
                    ("A|" if allow else "D|") + pat
                    for pat, allow in parsed["rules"]
                ).encode()
            )
        n = len(hosts)
        return pa.table(
            {
                "ck": pa.array(_ckey(hosts), pa.int64()),
                "side": pa.array(np.ones(n, np.int8), pa.int8()),
                "host": pa.array([h.lower() for h in hosts], pa.string()),
                "doc_id": pa.array(np.zeros(n, np.int64), pa.int64()),
                "url": pa.array([""] * n, pa.string()),
                "path": pa.array([""] * n, pa.string()),
                "rules": pa.array(blobs, pa.binary()),
            }
        )

    def gate(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for host, sub in g.groupby("host", sort=False):
            pages_sub = sub[sub["side"] == 0]
            if not len(pages_sub):
                continue
            rule_rows = sub[sub["side"] == 1]
            rules: list[tuple[str, bool]] = []
            if len(rule_rows):
                blob = rule_rows["rules"].iloc[0]
                if blob:
                    for ln in blob.decode().split("\n"):
                        rules.append((ln[2:], ln[0] == "A"))
            paths = pages_sub["path"].to_numpy()
            if rules:
                allowed = np.fromiter(
                    (robots_allowed(rules, p) for p in paths),
                    dtype=bool,
                    count=len(paths),
                )
            else:
                allowed = np.ones(len(paths), dtype=bool)
            out.append(
                pd.DataFrame(
                    {
                        "doc_id": pages_sub["doc_id"].to_numpy(),
                        "url": pages_sub["url"].to_numpy(),
                        "allowed": allowed.astype(np.int64),
                    }
                )
            )
        if not out:
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype=np.int64),
                    "url": pd.Series([], dtype=str),
                    "allowed": pd.Series([], dtype=np.int64),
                }
            )
        return pd.concat(out, ignore_index=True)

    pages_t = pages.map_batches(tag_pages, batch_format="pyarrow")
    rules_t = robots.map_batches(tag_rules, batch_format="pyarrow")
    return (
        pages_t.union(rules_t)
        .groupby("ck")
        .map_groups(gate, batch_format="pandas")
    )


# ------------------------------------------------------- posting lists


def varbyte_encode(vals: np.ndarray) -> bytes:
    """Classic VB-encoding: 7 data bits per byte, high bit set on the
    terminal byte of each value."""
    out = bytearray()
    for v in vals:
        v = int(v)
        bs = []
        bs.append((v & 0x7F) | 0x80)
        v >>= 7
        while v:
            bs.append(v & 0x7F)
            v >>= 7
        out.extend(reversed(bs))
    return bytes(out)


def varbyte_decode(blob: bytes) -> list[int]:
    vals, cur = [], 0
    for b in blob:
        if b & 0x80:
            vals.append((cur << 7) | (b & 0x7F))
            cur = 0
        else:
            cur = (cur << 7) | b
    return vals


def _postings_partial(text_col: str, id_col: str):
    def f(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b.column(text_col), pattern=" ")
        flat = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        parents = pc.list_parent_indices(flat)
        terms = pc.list_flatten(flat)
        ids = pc.take(b.column(id_col), parents)
        t = pa.table({"term": terms, "doc_id": ids})
        t = t.filter(pc.not_equal(t.column("term"), ""))
        df = t.to_pandas()
        tf = (
            df.groupby(["term", "doc_id"], sort=False)
            .size()
            .rename("tf")
            .reset_index()
        )
        tf["tf"] = tf["tf"].astype(np.int64)
        return pa.Table.from_pandas(tf, preserve_index=False)

    return f


def _seg_assemble(g: pd.DataFrame) -> pd.DataFrame:
    """One group = one (term, segment): sort by doc_id, delta/varbyte."""
    rows = []
    for (term, seg), sub in g.groupby(["term", "seg"], sort=False):
        sub = sub.sort_values("doc_id", kind="mergesort")
        docs = sub["doc_id"].to_numpy(np.int64)
        gaps = np.diff(docs)
        rows.append(
            {
                "term": term,
                "seg": int(seg),
                "seg_df": np.int64(len(docs)),
                "seg_tf": np.int64(sub["tf"].sum()),
                "doc_lo": docs[0],
                "doc_hi": docs[-1],
                "gap2_in": np.int64((gaps.astype(np.int64) ** 2).sum()),
                "blob": varbyte_encode(
                    np.concatenate(([docs[0]], gaps))
                ),
            }
        )
    return pd.DataFrame(rows)


def _term_stitch(g: pd.DataFrame) -> pd.DataFrame:
    rows = []
    for term, sub in g.groupby("term", sort=False):
        sub = sub.sort_values("seg", kind="mergesort")
        lo = sub["doc_lo"].to_numpy(np.int64)
        hi = sub["doc_hi"].to_numpy(np.int64)
        boundary = lo[1:] - hi[:-1]
        rows.append(
            {
                "term": term,
                "df": np.int64(sub["seg_df"].sum()),
                "tf_total": np.int64(sub["seg_tf"].sum()),
                "doc_lo": lo[0],
                "doc_hi": hi[-1],
                "gap2": np.int64(
                    sub["gap2_in"].sum() + (boundary.astype(np.int64) ** 2).sum()
                ),
                "n_segs": np.int64(len(sub)),
            }
        )
    return pd.DataFrame(rows)


def build_postings(
    docs,
    text_col: str = "text",
    id_col: str = "doc_id",
    seg_bits: int = 12,
    coarse: int = 64,
):
    """Segmented delta-encoded posting lists + per-term summary.

    Returns ``(segments, summary)`` Datasets. ``segments`` has one row per
    (term, doc_id >> seg_bits) with the VB-encoded within-segment posting
    blob (first doc absolute, then gaps); ``summary`` has one row per term
    (term, df, tf_total, doc_lo, doc_hi, gap2, n_segs) where gap2 is the
    sum of squared consecutive-doc gaps over the GLOBAL sorted posting list
    — an order-sensitive checksum that verifies segment stitching exactly.
    """

    def add_keys(b: pa.Table) -> pa.Table:
        # coarse key over (term, seg) — NOT term alone: a stopword-grade
        # term must spread across groups segment-by-segment, else one group
        # would hold its entire posting list
        seg = pc.cast(pc.shift_right(b.column("doc_id"), seg_bits), pa.int64())
        terms = b.column("term").to_pylist()
        segv = seg.to_numpy(zero_copy_only=False)
        ckv = np.array(
            [
                int.from_bytes(
                    hashlib.md5(f"{t}\x00{s}".encode()).digest()[:4], "big"
                )
                % coarse
                for t, s in zip(terms, segv)
            ],
            dtype=np.int64,
        )
        return b.append_column("seg", seg).append_column(
            "ck", pa.array(ckv, pa.int64())
        )

    tf = docs.map_batches(
        _postings_partial(text_col, id_col), batch_format="pyarrow"
    ).map_batches(add_keys, batch_format="pyarrow")
    segments = tf.groupby("ck").map_groups(_seg_assemble, batch_format="pandas")
    summary = (
        segments.drop_columns(["blob"])
        .groupby("term")
        .map_groups(_term_stitch, batch_format="pandas")
    )
    return segments, summary
