"""Web x geo fusion: link-graph metrics aggregated per spatial zone.

The graft cell's two payloads meet here: the crawl side derives per-doc
link metrics (outdegree from PARSED html anchors, fixed-point PageRank),
the geo side assigns each doc's geocoded point to polygon zones, and one
groupby produces per-zone link statistics — "which regions host the
best-linked pages".

Shapes: the merge of the two per-doc metric streams is a tagged union +
coarse-keyed cogroup (256 groups, segmented sums — never a per-doc join);
zone assignment is STATELESS (the zone rects broadcast in the closure,
strict-interior test matching pip_join); the final exchange is the tiny
per-zone groupby. Every metric is an int64, so all sums are
order-independent and the chained SQL oracle (edges CTE + unrolled
pagerank + PIP condition) matches bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def zone_link_stats(pages, num_nodes: int, zone_bounds, pr_iters: int = 5):
    """Per-zone link-graph stats over a (linked) pages Dataset.

    Returns (zone_id, n_docs, sum_outdeg, sum_pr_int): docs strictly
    inside each zone rect, their total parsed outdegree and total
    fixed-point PageRank mass.
    """
    from ..stages.graph import pagerank
    from ..stages.web import link_edges
    from .. import synth

    zb = [(int(z), float(a), float(b), float(c), float(d))
          for z, a, b, c, d in zone_bounds]
    ncoarse = 256

    edges = link_edges(pages).map_batches(
        lambda b: pa.table(
            {
                "src": b.column("src_doc").cast(pa.int64()),
                "dst": b.column("dst_doc").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )

    # per-doc outdegree: one groupby over the edge stream, tagged side 0
    def deg_rows(b: pa.Table) -> pa.Table:
        d = b.column("src").to_numpy().astype(np.int64)
        c = b.column("count()").to_numpy().astype(np.int64)
        return pa.table(
            {
                "doc": pa.array(d, pa.int64()),
                "outdeg": pa.array(c, pa.int64()),
                "pr_int": pa.array(np.zeros(len(d), np.int64), pa.int64()),
                "ckey": pa.array(d % ncoarse, pa.int64()),
            }
        )

    deg = edges.groupby("src").count().map_batches(deg_rows, batch_format="pyarrow")

    # per-doc pagerank (every node gets a row), tagged side 1
    def pr_rows(b: pa.Table) -> pa.Table:
        d = b.column("node").to_numpy().astype(np.int64)
        p = b.column("pr_int").to_numpy().astype(np.int64)
        return pa.table(
            {
                "doc": pa.array(d, pa.int64()),
                "outdeg": pa.array(np.zeros(len(d), np.int64), pa.int64()),
                "pr_int": pa.array(p, pa.int64()),
                "ckey": pa.array(d % ncoarse, pa.int64()),
            }
        )

    pr = pagerank(edges, num_nodes, iters=pr_iters).map_batches(
        pr_rows, batch_format="pyarrow"
    )

    def fuse(g: pd.DataFrame) -> pd.DataFrame:
        doc = g["doc"].to_numpy()
        # segmented sum merges the two metric streams per doc (outdeg rows
        # carry pr 0 and vice versa); every node has a pagerank row, so
        # the merged frame covers all docs of this coarse group
        order = np.argsort(doc, kind="stable")
        doc = doc[order]
        od = g["outdeg"].to_numpy()[order]
        pi = g["pr_int"].to_numpy()[order]
        uniq, starts = np.unique(doc, return_index=True)
        od_s = np.add.reduceat(od, starts)
        pi_s = np.add.reduceat(pi, starts)
        lon, lat = synth.geocode_ids(uniq)
        zid, nd, sod, spi = [], [], [], []
        for z, x0, y0, x1, y1 in zb:
            m = (lon > x0) & (lon < x1) & (lat > y0) & (lat < y1)
            if not m.any():
                continue
            zid.append(z)
            nd.append(int(m.sum()))
            sod.append(int(od_s[m].sum()))
            spi.append(int(pi_s[m].sum()))
        return pd.DataFrame(
            {
                "zone_id": np.asarray(zid, np.int64),
                "n_docs": np.asarray(nd, np.int64),
                "sum_outdeg": np.asarray(sod, np.int64),
                "sum_pr_int": np.asarray(spi, np.int64),
            }
        )

    parts = deg.union(pr).groupby("ckey").map_groups(fuse, batch_format="pandas")
    out = parts.groupby("zone_id").sum(["n_docs", "sum_outdeg", "sum_pr_int"])
    return out.map_batches(
        lambda b: b.rename_columns(
            ["zone_id", "n_docs", "sum_outdeg", "sum_pr_int"]
        ),
        batch_format="pyarrow",
    )


def zone_top_tokens(docs, zone_bounds, m: int = 5):
    """Per-zone top-m tokens (regional vocabulary) — geo x text fusion.

    Stage 1 collapses each batch to (zone_id, token, cnt) partials (zone
    rects broadcast, strict interior, docs may belong to several
    overlapping zones); stage 2 is the native multi-key groupby-sum; stage
    3 is the exact distributed top-k (stages/rank.py partial-combiner
    shape) ordered by (cnt DESC, token ASC). The exchange after stage 1 is
    bounded by distinct (zone, token) pairs per batch, never documents.
    """
    from collections import Counter

    from ..stages.rank import top_k_per_group
    from .. import synth

    zb = [(int(z), float(a), float(b), float(c), float(d))
          for z, a, b, c, d in zone_bounds]

    def partial(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy().astype(np.int64)
        texts = b.column("text").to_pylist()
        lon, lat = synth.geocode_ids(ids)
        toks = [(t or "").split(" ") for t in texts]
        zid, tok, cnt = [], [], []
        for z, x0, y0, x1, y1 in zb:
            mask = (lon > x0) & (lon < x1) & (lat > y0) & (lat < y1)
            if not mask.any():
                continue
            c = Counter()
            for i in np.nonzero(mask)[0]:
                c.update(toks[i])
            zid.extend([z] * len(c))
            tok.extend(c.keys())
            cnt.extend(c.values())
        return pa.table(
            {
                "zone_id": pa.array(np.asarray(zid, np.int64), pa.int64()),
                "token": pa.array(tok, pa.string()),
                "cnt": pa.array(np.asarray(cnt, np.int64), pa.int64()),
            }
        )

    parts = docs.map_batches(partial, batch_format="pyarrow")
    counts = parts.groupby(["zone_id", "token"]).sum("cnt")
    counts = counts.map_batches(
        lambda b: b.rename_columns(["zone_id", "token", "cnt"]),
        batch_format="pyarrow",
    )
    return top_k_per_group(counts, "zone_id", "cnt", m, tie_col="token")
