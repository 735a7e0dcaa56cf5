"""CDX index / SURT / robots.txt / posting-list operators (stages/webindex)."""

import hashlib

import duckdb
import numpy as np
import pandas as pd
import pytest

from exactextractr_ray.sources.pages import (
    make_robots_txt,
    read_pages,
    read_robots,
)
from exactextractr_ray.sources.warc import write_warc
from exactextractr_ray.stages.webindex import (
    apply_robots,
    build_cdx,
    build_postings,
    parse_robots,
    robots_allowed,
    surt,
    varbyte_decode,
    varbyte_encode,
    warc_record_length,
)

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------- SURT


def test_surt_canonicalization():
    assert surt("https://www.Example.COM/Path/X") == "com,example)/path/x"
    assert surt("http://a.b.example.org:8080/p") == "org,example,b,a:8080)/p"
    assert surt("https://example.org:443/p") == "org,example)/p"
    assert surt("http://example.org:80/") == "org,example)/"
    assert surt("https://www2.site.net/x#frag") == "net,site)/x"
    assert (
        surt("https://site.net/q?b=2&A=1") == "net,site)/q?a=1&b=2"
    )  # sorted, lowercased query
    assert surt("https://u:pw@host.io/s") == "io,host)/s"
    assert surt("https://site.net") == "net,site)/"


# ------------------------------------------------------------ CDX index


def test_warc_record_length_matches_write_warc(tmp_path):
    recs = [
        {
            "url": "https://site0001.example/page/1",
            "warc_ts": "2024-01-01T00:00:01Z",
            "html": b"<html><body>hi</body></html>",
        },
        {
            "url": "https://site0002.example/page/22",
            "warc_ts": "2024-01-01T00:00:22Z",
            "html": b"x" * 999,
        },
    ]
    p = tmp_path / "t.warc"
    write_warc(str(p), recs)
    buf = p.read_bytes()
    lens = [
        warc_record_length(r["url"], r["warc_ts"], len(r["html"])) for r in recs
    ]
    assert sum(lens) == len(buf)
    # the second record must start exactly at offset lens[0]
    assert buf[lens[0] : lens[0] + 8] == b"WARC/1.0"


def test_build_cdx_against_recompute_and_real_warc(tmp_path, ray_session):
    pages = read_pages(SF)
    idx = build_cdx(pages, num_shards=4).to_pandas()
    raw = pages.to_pandas()

    # index covers every capture once, sorted by surt
    assert len(idx) == len(raw)
    assert list(idx["surt"]) == sorted(idx["surt"])

    # row-level recompute
    ts14 = raw["warc_ts"].dt.strftime("%Y%m%d%H%M%S")
    dates = raw["warc_ts"].dt.strftime("%Y-%m-%dT%H:%M:%SZ")
    exp = pd.DataFrame(
        {
            "surt": [surt(u) for u in raw["url"]],
            "ts14": ts14.to_numpy(),
            "url": raw["url"],
            "digest": [hashlib.md5(h).hexdigest() for h in raw["html"]],
            "rec_len": [
                warc_record_length(u, d, len(h))
                for u, d, h in zip(raw["url"], dates, raw["html"])
            ],
            "shard": (raw["doc_id"] % 4).astype(np.int64),
        }
    )
    got = idx.sort_values("url").reset_index(drop=True)
    exp = exp.sort_values("url").reset_index(drop=True)
    for c in ("surt", "ts14", "digest", "rec_len", "shard"):
        assert list(got[c]) == list(exp[c]), c

    # offsets are REAL byte positions: write shard 2's WARC in capture
    # order and check each record begins at its recorded offset
    sh = idx[idx["shard"] == 2].sort_values(["ts14", "url"])
    raw_i = raw.set_index("url")
    recs = [
        {
            "url": u,
            "warc_ts": d,
            "html": bytes(raw_i.loc[u, "html"]),
        }
        for u, d in zip(
            sh["url"],
            pd.to_datetime(sh["ts14"], format="%Y%m%d%H%M%S").dt.strftime(
                "%Y-%m-%dT%H:%M:%SZ"
            ),
        )
    ]
    p = tmp_path / "shard2.warc"
    write_warc(str(p), recs)
    buf = p.read_bytes()
    for off in sh["offset"]:
        assert buf[int(off) : int(off) + 8] == b"WARC/1.0"
    assert int(sh["offset"].iloc[-1] + sh["rec_len"].iloc[-1]) == len(buf)
    assert (sh["filename"] == "crawl/warc-00002.warc").all()


# ------------------------------------------------------------ robots.txt


def test_parse_robots_group_selection_and_fields():
    body = make_robots_txt(123)
    # '*' group for an unlisted agent
    r = parse_robots(body, "ccbot")
    assert r["rules"] == [("/page/3", False), ("/page/32", True)]
    assert r["crawl_delay"] == 2.0
    assert r["sitemaps"] == ["https://site0123.example/sitemap.xml"]
    # named group beats '*'
    r2 = parse_robots(body, "MegaCrawler/1.0")
    assert r2["rules"] == [("/", False)]


def test_parse_robots_multi_agent_group_and_comments():
    body = (
        b"User-agent: a\nUser-agent: b\nDisallow: /x # tail comment\n\n"
        b"User-agent: *\nDisallow:\n"
    )
    assert parse_robots(body, "b-bot")["rules"] == [("/x", False)]
    # empty Disallow = no rule
    assert parse_robots(body, "other")["rules"] == []


def test_robots_allowed_precedence_and_wildcards():
    rules = [("/p", False), ("/p/q", True)]
    assert robots_allowed(rules, "/p/q/r")  # longer allow wins
    assert not robots_allowed(rules, "/p/x")
    assert robots_allowed(rules, "/other")
    # tie: allow wins
    assert robots_allowed([("/a", False), ("/a", True)], "/a/b")
    # wildcard + end anchor
    assert not robots_allowed([("/*.pdf$", False)], "/docs/x.pdf")
    assert robots_allowed([("/*.pdf$", False)], "/docs/x.pdf?dl=1")
    assert not robots_allowed([("/a*z", False)], "/amazingz")


def test_apply_robots_matches_arithmetic_rule(ray_session):
    pages = read_pages(SF)
    got = (
        apply_robots(pages, read_robots(1000), agent="ccbot")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    ids = got["doc_id"].to_numpy()
    site = ids % 1000
    a = (site % 10).astype(str)
    b = ((site // 10) % 10).astype(str)
    s = ids.astype(str)
    blocked = np.array(
        [
            si.startswith(ai) and not si.startswith(ai + bi)
            for si, ai, bi in zip(s, a, b)
        ]
    )
    assert (got["allowed"].to_numpy() == (~blocked).astype(np.int64)).all()
    assert blocked.any() and (~blocked).any()  # both classes exercised


# --------------------------------------------------------- posting lists


def test_varbyte_roundtrip():
    vals = [0, 1, 127, 128, 300, 2**20, 2**40 + 5]
    assert varbyte_decode(varbyte_encode(np.array(vals))) == vals


def test_build_postings_summary_and_blobs(ray_session):
    import ray.data

    docs = ray.data.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    )
    # seg_bits=6 forces many multi-segment terms (doc ids up to ~500)
    segments, summary = build_postings(docs, seg_bits=6)
    seg_df = segments.to_pandas()
    summ = summary.to_pandas().sort_values("term").reset_index(drop=True)

    oracle = duckdb.sql(
        f"""
        WITH flat AS (
          SELECT doc_id,
                 UNNEST(list_filter(string_split(text,' '), x -> x<>''))
                   AS term
          FROM read_parquet('{SF}/documents.parquet')
        ), tf AS (
          SELECT term, doc_id, COUNT(*)::BIGINT AS tf
          FROM flat GROUP BY 1, 2
        ), gaps AS (
          SELECT term, doc_id, tf,
                 doc_id - lag(doc_id) OVER
                   (PARTITION BY term ORDER BY doc_id) AS gap
          FROM tf
        )
        SELECT term, COUNT(*)::BIGINT AS df, SUM(tf)::BIGINT AS tf_total,
               MIN(doc_id) AS doc_lo, MAX(doc_id) AS doc_hi,
               COALESCE(SUM(gap*gap), 0)::BIGINT AS gap2
        FROM gaps GROUP BY term ORDER BY term
        """
    ).df()
    assert list(summ["term"]) == list(oracle["term"])
    for c in ("df", "tf_total", "doc_lo", "doc_hi", "gap2"):
        assert list(summ[c].astype(np.int64)) == list(
            oracle[c].astype(np.int64)
        ), c
    assert (summ["n_segs"] > 1).any()  # stitching actually exercised

    # blob round-trip: segments concatenated in seg order reproduce the
    # exact global posting list
    brute = duckdb.sql(
        f"""
        SELECT term, list(DISTINCT doc_id ORDER BY doc_id) AS docs
        FROM (SELECT doc_id,
                     UNNEST(list_filter(string_split(text,' '), x -> x<>''))
                       AS term
              FROM read_parquet('{SF}/documents.parquet'))
        GROUP BY term
        """
    ).df()
    brute = {r["term"]: list(r["docs"]) for _, r in brute.iterrows()}
    for term, sub in seg_df.groupby("term"):
        sub = sub.sort_values("seg")
        docs_out = []
        for blob in sub["blob"]:
            vals = varbyte_decode(bytes(blob))
            docs_out.extend(np.cumsum(vals).tolist())
        assert docs_out == brute[term], term
