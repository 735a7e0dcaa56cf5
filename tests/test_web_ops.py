"""snapshot_diff (stages/web.py): crawl-diff with full-outer semantics."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


@pytest.fixture
def _ray(ray_session):
    yield


def _snap(rows, parallelism=1):
    import ray.data

    ds = ray.data.from_arrow(
        pa.table(
            {
                "key": pa.array([r[0] for r in rows], pa.int64()),
                "h": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )
    return ds.repartition(parallelism) if parallelism > 1 else ds


OLD = [(1, "a"), (2, "b"), (3, "c"), (4, "d")]
NEW = [(2, "b"), (3, "C"), (4, "d"), (5, "e")]
EXPECT = {1: "removed", 2: "unchanged", 3: "changed", 4: "unchanged", 5: "added"}


def _run(parallelism=1, **kw):
    from exactextractr_ray.stages.web import snapshot_diff

    df = (
        snapshot_diff(
            _snap(OLD, parallelism), _snap(NEW, parallelism), "key", "h", **kw
        )
        .to_pandas()
        .sort_values("key")
        .reset_index(drop=True)
    )
    return df


def test_snapshot_diff_statuses(_ray):
    df = _run()
    assert dict(zip(df["key"], df["status"])) == EXPECT


def test_snapshot_diff_parallelism_invariant(_ray):
    a = _run()
    b = _run(parallelism=5, num_coarse_groups=3)
    pd.testing.assert_frame_equal(a, b)


def test_snapshot_diff_disjoint(_ray):
    from exactextractr_ray.stages.web import snapshot_diff

    df = (
        snapshot_diff(_snap([(1, "x")]), _snap([(2, "y")]), "key", "h")
        .to_pandas()
        .sort_values("key")
        .reset_index(drop=True)
    )
    assert dict(zip(df["key"], df["status"])) == {1: "removed", 2: "added"}


# ---------------- outlink extraction (stages/web.py link_edges) ----------------


def test_linked_pages_extraction_invariant(_ray):
    """The <nav> anchor block must not change the frozen extractor output:
    byte-identical extracted text with and without links, for every page."""
    from exactextractr_ray.sources.pages import read_linked_pages, read_pages
    from exactextractr_ray.stages.text import extract_text_bytes

    sf = "/root/testdata/sf0.001"
    plain = {
        r["doc_id"]: extract_text_bytes(r["html"])
        for r in read_pages(sf).take_all()
    }
    linked = read_linked_pages(sf).take_all()
    assert len(linked) == len(plain)
    for r in linked:
        assert extract_text_bytes(r["html"]) == plain[r["doc_id"]]


def test_extract_links_batch_rules():
    """Self-links dropped, page order preserved, hrefs parsed verbatim."""
    from exactextractr_ray.stages.web import extract_links_batch

    batch = pa.table(
        {
            "doc_id": pa.array([7, 8], pa.int64()),
            "url": pa.array(["https://a/7", "https://a/8"], pa.string()),
            "html": pa.array(
                [
                    b'<p>x</p><a href="https://a/8"></a><a href="https://a/7"></a>',
                    b"<p>no links</p>",
                ],
                pa.binary(),
            ),
        }
    )
    out = extract_links_batch(batch)
    assert out.column("src_doc").to_pylist() == [7]
    assert out.column("href").to_pylist() == ["https://a/8"]


def test_link_edges_resolves_and_drops_external(_ray):
    """hrefs outside the corpus drop out of the inner url join."""
    import ray.data

    from exactextractr_ray.stages.web import link_edges

    pages = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "url": pa.array(["https://a/0", "https://a/1"], pa.string()),
                "html": pa.array(
                    [
                        b'<a href="https://a/1"></a><a href="https://elsewhere/x"></a>',
                        b'<a href="https://a/0"></a>',
                    ],
                    pa.binary(),
                ),
            }
        )
    )
    df = link_edges(pages, num_partitions=2).to_pandas()
    got = sorted(zip(df["src_doc"], df["dst_doc"]))
    assert got == [(0, 1), (1, 0)]


def test_page_link_targets_rule():
    """k_i = i % 4 anchors at (7i + 13j + 1) % n, dangling i%4==0 pages."""
    from exactextractr_ray.sources.pages import page_link_targets

    src, dst = page_link_targets(np.arange(8), n=50)
    # i=0,4 dangle; i=1 has 1, i=2 has 2, i=3 has 3 anchors, etc.
    assert list(src) == [1, 2, 2, 3, 3, 3, 5, 6, 6, 7, 7, 7]
    assert list(dst[:6]) == [8, 15, 28, 22, 35, 48]


def test_extract_links_malformed_html():
    """Unclosed/malformed anchors never crash; only well-formed
    double-quoted hrefs parse (the frozen crawl rule)."""
    from exactextractr_ray.stages.web import extract_links_batch

    batch = pa.table(
        {
            "doc_id": pa.array([1], pa.int64()),
            "url": pa.array(["https://a/1"], pa.string()),
            "html": pa.array(
                [
                    b"<a href='single-quoted'></a><a href=unquoted>"
                    b'<a href="ok/1"></a><a data-x="y" href="ok/2"></a>'
                    b'<a href="trunc',
                ],
                pa.binary(),
            ),
        }
    )
    out = extract_links_batch(batch)
    assert out.column("href").to_pylist() == ["ok/1", "ok/2"]


def test_zone_link_stats_manual(_ray):
    """Fusion aggregate vs a hand computation on sf0.001."""
    import ray.data  # noqa: F401

    from exactextractr_ray import synth
    from exactextractr_ray.pipelines.fusion import zone_link_stats
    from exactextractr_ray.sources.pages import (
        page_link_targets,
        read_linked_pages,
    )
    from exactextractr_ray.stages.graph import pagerank
    from exactextractr_ray.stages.web import link_edges

    sf = "/root/testdata/sf0.001"
    n = 500
    zb = [(k, *synth.synth_geo_zone_bounds(k)) for k in range(4)]
    df = (
        zone_link_stats(read_linked_pages(sf), n, zb)
        .to_pandas()
        .sort_values("zone_id")
        .reset_index(drop=True)
    )
    # manual: derive edges from the fixture rule, outdeg + pagerank
    src, dst = page_link_targets(np.arange(n), n)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    outdeg = np.bincount(src, minlength=n)
    pr = (
        pagerank(
            link_edges(read_linked_pages(sf)).map_batches(
                lambda b: pa.table(
                    {
                        "src": b.column("src_doc").cast(pa.int64()),
                        "dst": b.column("dst_doc").cast(pa.int64()),
                    }
                ),
                batch_format="pyarrow",
            ),
            n,
        )
        .to_pandas()
        .sort_values("node")["pr_int"]
        .to_numpy()
    )
    lon, lat = synth.geocode_ids(np.arange(n))
    for _, row in df.iterrows():
        k = int(row["zone_id"])
        _, x0, y0, x1, y1 = zb[k]
        m = (lon > x0) & (lon < x1) & (lat > y0) & (lat < y1)
        assert row["n_docs"] == int(m.sum())
        assert row["sum_outdeg"] == int(outdeg[m].sum())
        assert row["sum_pr_int"] == int(pr[m].sum())


def test_zone_top_tokens_manual(_ray):
    """Regional vocabulary vs a hand count on one zone."""
    from collections import Counter

    from exactextractr_ray import synth
    from exactextractr_ray.pipelines.fusion import zone_top_tokens

    sf = "/root/testdata/sf0.001"
    import ray.data

    docs = ray.data.read_parquet(
        f"{sf}/documents.parquet", columns=["doc_id", "text"]
    )
    zb = [(k, *synth.synth_geo_zone_bounds(k)) for k in range(3)]
    df = zone_top_tokens(docs, zb, m=4).to_pandas()
    tbl = docs.to_pandas()
    lon, lat = synth.geocode_ids(tbl["doc_id"].to_numpy())
    for k, x0, y0, x1, y1 in zb:
        m = (lon > x0) & (lon < x1) & (lat > y0) & (lat < y1)
        c = Counter()
        for t in tbl.loc[m, "text"]:
            c.update(t.split(" "))
        if not c:
            assert (df["zone_id"] == k).sum() == 0
            continue
        want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:4]
        sub = df[df["zone_id"] == k].sort_values("rnk")
        assert list(zip(sub["token"], sub["cnt"])) == want
        assert sub["rnk"].tolist() == list(range(1, len(want) + 1))


def test_continuation_ops_empty_inputs(_ray):
    """Empty/degenerate inputs never crash the continuation-wave ops."""
    import ray.data

    from exactextractr_ray import synth
    from exactextractr_ray.pipelines.fusion import zone_top_tokens
    from exactextractr_ray.stages.cluster import label_centroids, linreg_fit
    from exactextractr_ray.stages.web import link_edges

    empty_docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "text": pa.array([], pa.string()),
            }
        )
    )
    zb = [(k, *synth.synth_geo_zone_bounds(k)) for k in range(3)]
    assert len(zone_top_tokens(empty_docs, zb).to_pandas()) == 0

    # pages with no anchors at all -> empty edge list
    pages = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0], pa.int64()),
                "url": pa.array(["https://a/0"], pa.string()),
                "html": pa.array([b"<p>x</p>"], pa.binary()),
            }
        )
    )
    assert len(link_edges(pages, num_partitions=2).to_pandas()) == 0

    # zero-row regression -> singular, NaN coefficients, no crash
    ds0 = ray.data.from_arrow(
        pa.table(
            {
                "n_tokens": pa.array([], pa.int64()),
                "n_unique": pa.array([], pa.int64()),
                "n_chars": pa.array([], pa.int64()),
            }
        )
    )
    df = linreg_fit(ds0, ["n_tokens", "n_unique"], "n_chars").to_pandas()
    # zero-row input: either no moment row at all (empty blocks skipped)
    # or a degenerate n=0 / NaN-coefficient row — never a crash
    assert len(df) == 0 or (df["n"][0] == 0 and np.isnan(df["coef_0"][0]))

    # empty embedding table -> zero centroid rows
    e0 = ray.data.from_arrow(
        pa.table(
            {
                "label": pa.array([], pa.int64()),
                "embedding": pa.array([], pa.list_(pa.float32())),
            }
        )
    )
    assert len(label_centroids(e0).to_pandas()) == 0


def test_crawl_frontier_manual(_ray):
    """Frontier = anchors at URLs absent from the page set, counted."""
    import ray.data

    from exactextractr_ray.stages.web import crawl_frontier

    pages = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "url": pa.array(["https://a/0", "https://a/1"], pa.string()),
                "html": pa.array(
                    [
                        b'<a href="https://a/1"></a><a href="https://x/9"></a>'
                        b'<a href="https://x/9"></a>',
                        b'<a href="https://y/7"></a>',
                    ],
                    pa.binary(),
                ),
            }
        )
    )
    df = (
        crawl_frontier(pages)
        .to_pandas()
        .sort_values("href")
        .reset_index(drop=True)
    )
    assert list(zip(df["href"], df["n_refs"])) == [
        ("https://x/9", 2),
        ("https://y/7", 1),
    ]
