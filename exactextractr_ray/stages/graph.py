"""Link-graph operators over a (src, dst) edge table — the web-graph side of
a crawl-curation pipeline (PageRank for document quality weighting, degree
stats for spam heuristics).

PageRank here is the classic distributed iteration expressed Ray-Data-first:

* the EDGE table (the 100-TB side) streams through one hash join + one
  groupby per iteration and is NEVER materialized;
* the RANK vector (16 B/node — the minimal state an iterative algorithm
  must persist) is checkpointed with ``materialize()`` once per iteration,
  exactly the iteration-frontier pattern;
* all arithmetic is FIXED-POINT int64 (rank mass scaled to ``scale``), so
  every distributed sum is order-independent and the DuckDB oracle matches
  bit-for-bit — the same determinism trick as the integer-cents money
  columns in pipelines/relational.py.

Update rule (integer form of the damped PageRank step, d = 85/100):

    r0(v)   = scale // n
    base    = (15 * (scale // n)) // 100
    r'(v)   = base + (85 * S(v)) // 100,
    S(v)    = sum over in-edges (u -> v) of  r(u) // outdeg(u)

Total rank mass stays <= scale, so 85 * S(v) < 2^63 for scale <= 10^15.
Dangling nodes (no out-edges) leak mass — the standard simplification;
nodes with no IN-edges are kept at ``base`` via a zero-contribution union
(cheaper than a per-iteration left join).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def out_degree(edges, src_col: str = "src"):
    """(src, outdeg) — one groupby-count over the edge stream."""
    agg = edges.groupby(src_col).count()
    return agg.map_batches(
        lambda b: b.rename_columns([src_col, "outdeg"]),
        batch_format="pyarrow",
    )


def degree_table(edges, num_nodes: int, src_col: str = "src", dst_col: str = "dst"):
    """(node, outdeg, indeg) for every node in [0, num_nodes).

    One shuffle total: out-count rows, in-count rows and a zero row per
    node are tagged into a common (node, o, i) shape, unioned, and summed
    in a single groupby — no join, and nodes with no edges still appear.
    """
    import ray.data

    def _o(b: pa.Table) -> pa.Table:
        c = b.column("count()").cast(pa.int64())
        return pa.table(
            {
                "node": b.column(src_col).cast(pa.int64()),
                "o": c,
                "i": pa.array(np.zeros(len(b), np.int64), pa.int64()),
            }
        )

    def _i(b: pa.Table) -> pa.Table:
        c = b.column("count()").cast(pa.int64())
        return pa.table(
            {
                "node": b.column(dst_col).cast(pa.int64()),
                "o": pa.array(np.zeros(len(b), np.int64), pa.int64()),
                "i": c,
            }
        )

    def _z(b: pa.Table) -> pa.Table:
        z = pa.array(np.zeros(len(b), np.int64), pa.int64())
        return pa.table(
            {"node": b.column("id").cast(pa.int64()), "o": z, "i": z}
        )

    out_c = edges.groupby(src_col).count().map_batches(_o, batch_format="pyarrow")
    in_c = edges.groupby(dst_col).count().map_batches(_i, batch_format="pyarrow")
    zeros = ray.data.range(num_nodes).map_batches(_z, batch_format="pyarrow")
    merged = out_c.union(in_c).union(zeros).groupby("node").sum(["o", "i"])
    return merged.map_batches(
        lambda b: b.rename_columns(["node", "outdeg", "indeg"]),
        batch_format="pyarrow",
    )


def pagerank(
    edges,
    num_nodes: int,
    iters: int = 5,
    scale: int = 10**12,
    src_col: str = "src",
    dst_col: str = "dst",
    num_partitions: int | None = None,
):
    """Damped PageRank over an int64 (src, dst) edge Dataset.

    Returns a Dataset of (node, pr_int, pr): the fixed-point rank and its
    float projection ``pr_int / scale`` (one exact division, bit-stable).

    Node ids must lie in [0, num_nodes); every node gets a row even with no
    edges. Per iteration: edges ⋈ ranks (hash join on src), a vectorized
    ``r // outdeg`` map, and one groupby-sum keyed by dst — two exchanges
    of the edge stream, none of the corpus. ``iters`` is fixed (PageRank
    converges geometrically; production crawls use 10-20 rounds — the
    shape is identical, only the loop count grows).
    """
    import ray.data

    if num_nodes <= 0:
        raise ValueError("num_nodes must be positive")
    if num_partitions is None:
        # scale the join/shuffle width with the cluster, not a constant —
        # 8 partitions would serialize a 256-node cluster's exchanges
        num_partitions = max(8, int(ray.cluster_resources().get("CPU", 8)))
    # never create more hash-join partitions than nodes: tiny graphs with
    # wide joins leave most aggregator partitions empty, and Ray's hash
    # shuffle aggregator intermittently dies finalizing schema-less empty
    # states (ArrowInvalid) under load; big graphs are unaffected
    num_partitions = max(1, min(num_partitions, num_nodes))
    r0 = scale // num_nodes
    base = (15 * r0) // 100

    # Checkpoint the degree-annotated edge list ONCE: a lazy join here
    # would re-derive the graph + degree shuffle every iteration. One
    # object-store copy (spillable) traded against iters x recomputes —
    # the standard cached-edges pattern for iterative graph algorithms.
    deg = out_degree(edges, src_col)
    edges_deg = edges.join(
        deg, join_type="inner", num_partitions=num_partitions,
        on=(src_col,),
    ).materialize()

    # Ray's hash join chokes on empty-schema blocks (range() emits empty
    # residual blocks that lose their schema through map_batches) — build
    # the init vector with exactly min(num_partitions, n) non-empty blocks
    # and coalesce each iteration's output the same way before it becomes
    # a join side.
    n_blocks = max(1, min(num_partitions, num_nodes))
    ranks = (
        ray.data.range(num_nodes, override_num_blocks=n_blocks)
        .map_batches(
            lambda b: pa.table(
                {
                    "node": b.column("id").cast(pa.int64()),
                    "r": pa.array(
                        np.full(len(b), r0, dtype=np.int64), pa.int64()
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        .repartition(n_blocks)
        .materialize()
    )

    def _contrib(b: pa.Table) -> pa.Table:
        r = b.column("r").to_numpy()
        od = b.column("outdeg").to_numpy()
        return pa.table(
            {
                "dst": b.column(dst_col).cast(pa.int64()),
                "c": pa.array(r // od, pa.int64()),
            }
        )

    def _zero(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "dst": b.column("node"),
                "c": pa.array(np.zeros(len(b), dtype=np.int64), pa.int64()),
            }
        )

    def _apply(b: pa.Table) -> pa.Table:
        s = b.column("sum(c)").to_numpy().astype(np.int64)
        return pa.table(
            {
                "node": b.column("dst").cast(pa.int64()),
                "r": pa.array(base + (85 * s) // 100, pa.int64()),
            }
        )

    for _ in range(iters):
        joined = edges_deg.join(
            ranks, join_type="inner", num_partitions=num_partitions,
            on=(src_col,), right_on=("node",),
        )
        contrib = joined.map_batches(_contrib, batch_format="pyarrow")
        zeros = ranks.map_batches(_zero, batch_format="pyarrow")
        s = contrib.union(zeros).groupby("dst").sum("c")
        # checkpoint ONLY the frontier: num_nodes * 16 B, never the edges
        ranks = (
            s.map_batches(_apply, batch_format="pyarrow")
            .repartition(n_blocks)
            .materialize()
        )

    def _project(b: pa.Table) -> pa.Table:
        r = b.column("r").to_numpy().astype(np.int64)
        return pa.table(
            {
                "node": b.column("node"),
                "pr_int": b.column("r"),
                "pr": pa.array(r / float(scale), pa.float64()),
            }
        )

    return ranks.map_batches(_project, batch_format="pyarrow")


# ---------------- triangle counting ----------------


def triangle_counts(edges, coarse: int = 64, src_col: str = "src",
                    dst_col: str = "dst"):
    """Per-node triangle participation counts over the UNDIRECTED graph of
    the edge table — the classic two-round distributed algorithm (wedge
    generation at the lowest-ID vertex, then a wedge↔edge co-group probe;
    Cohen, "Graph twiddling in a MapReduce world", 2009):

    1. canonicalize (a=min, b=max); group edges by ``a`` (coarse-keyed) and
       enumerate each node's neighbor PAIRS (v, w), v < w — every candidate
       triangle is generated exactly once, at its smallest vertex. Pair
       enumeration is one vectorized triu-index expansion per group, with
       in-group dedup (no global DISTINCT shuffle needed: duplicates of an
       (a, *) edge always land in a's group).
    2. tag wedges (kind=1, carrying u) and canonical edges (kind=0) with a
       shared (v, w)-hash key; ONE coarse groupby co-locates them; a
       vectorized sorted-membership probe keeps wedges whose closing edge
       exists -> triangles (u < v < w), each exactly once.
    3. every triangle fans out to its 3 corners; a final groupby-sum yields
       (node, n_triangles) for nodes in >= 1 triangle.

    Shuffle volume: round 1 moves the edge list, round 2 moves edges +
    wedges (the wedge count = sum over nodes of C(d+, 2) — the algorithm's
    intrinsic cost; orienting at the smallest ID keeps d+ bounded for
    skewed hubs with large IDs, and a degree-ordered orientation is the
    documented upgrade for adversarial skew).
    """

    def canon(b: pa.Table) -> pa.Table:
        s = b.column(src_col).to_numpy().astype(np.int64)
        d = b.column(dst_col).to_numpy().astype(np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        a = np.minimum(s, d)
        bb = np.maximum(s, d)
        return pa.table(
            {
                "a": pa.array(a, pa.int64()),
                "b": pa.array(bb, pa.int64()),
                "ga": pa.array(a % coarse, pa.int64()),
            }
        )

    und = edges.map_batches(canon, batch_format="pyarrow")

    def wedges(g):
        import pandas as pd

        a = g["a"].to_numpy()
        b = g["b"].to_numpy()
        # in-group dedup (duplicates of (a, b) are always co-grouped)
        ab = np.unique(np.stack([a, b], axis=1), axis=0)
        a, b = ab[:, 0], ab[:, 1]
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        uniq, starts = np.unique(a, return_index=True)
        ends = np.append(starts[1:], len(a))
        out_u, out_v, out_w = [], [], []
        for s0, e0, u in zip(starts, ends, uniq):
            nb = b[s0:e0]  # sorted, unique
            if len(nb) < 2:
                continue
            iu, ju = np.triu_indices(len(nb), k=1)
            out_u.append(np.full(len(iu), u, np.int64))
            out_v.append(nb[iu])
            out_w.append(nb[ju])
        if not out_u:
            return pd.DataFrame(
                {
                    "u": pd.Series([], dtype=np.int64),
                    "v": pd.Series([], dtype=np.int64),
                    "w": pd.Series([], dtype=np.int64),
                }
            )
        return pd.DataFrame(
            {
                "u": np.concatenate(out_u),
                "v": np.concatenate(out_v),
                "w": np.concatenate(out_w),
            }
        )

    wedge_ds = und.groupby("ga").map_groups(wedges, batch_format="pandas")

    # round 2: co-group wedges (kind=1) and edges (kind=0) on a (v, w) hash
    P = np.int64(1_000_003)

    def tag_edge(b: pa.Table) -> pa.Table:
        a = b.column("a").to_numpy()
        bb = b.column("b").to_numpy()
        return pa.table(
            {
                "v": pa.array(a, pa.int64()),
                "w": pa.array(bb, pa.int64()),
                "u": pa.array(np.full(len(a), -1, np.int64), pa.int64()),
                "kind": pa.array(np.zeros(len(a), np.int64), pa.int64()),
                "gk": pa.array((a * P + bb) % coarse, pa.int64()),
            }
        )

    def tag_wedge(b: pa.Table) -> pa.Table:
        v = b.column("v").to_numpy()
        w = b.column("w").to_numpy()
        return pa.table(
            {
                "v": pa.array(v, pa.int64()),
                "w": pa.array(w, pa.int64()),
                "u": b.column("u"),
                "kind": pa.array(np.ones(len(v), np.int64), pa.int64()),
                "gk": pa.array((v * P + w) % coarse, pa.int64()),
            }
        )

    tagged = und.map_batches(tag_edge, batch_format="pyarrow").union(
        wedge_ds.map_batches(tag_wedge, batch_format="pyarrow")
    )

    def probe(g):
        import pandas as pd

        kind = g["kind"].to_numpy()
        v = g["v"].to_numpy()
        w = g["w"].to_numpy()
        u = g["u"].to_numpy()
        # unconditionally collision-free pair key: densify node ids to
        # LOCAL indices within this group (searchsorted over the group's
        # distinct ids), then pair-key in the dense space. Works for any
        # int64 node id — a shifted key like (v << 31) + w silently
        # produces phantom matches once ids reach 2^31.
        nodes = np.unique(np.concatenate([v, w]))
        n_local = np.int64(len(nodes))
        lv = np.searchsorted(nodes, v).astype(np.int64)
        lw = np.searchsorted(nodes, w).astype(np.int64)
        ek = lv[kind == 0] * n_local + lw[kind == 0]
        ek = np.unique(ek)
        wv, ww, wu = v[kind == 1], w[kind == 1], u[kind == 1]
        if len(wv) == 0 or len(ek) == 0:
            return pd.DataFrame(
                {
                    "u": pd.Series([], dtype=np.int64),
                    "v": pd.Series([], dtype=np.int64),
                    "w": pd.Series([], dtype=np.int64),
                }
            )
        wk = lv[kind == 1] * n_local + lw[kind == 1]
        pos = np.searchsorted(ek, wk)
        pos = np.clip(pos, 0, len(ek) - 1)
        hit = ek[pos] == wk
        return pd.DataFrame({"u": wu[hit], "v": wv[hit], "w": ww[hit]})

    tris = tagged.groupby("gk").map_groups(probe, batch_format="pandas")

    def corners(b: pa.Table) -> pa.Table:
        u = b.column("u").to_numpy()
        v = b.column("v").to_numpy()
        w = b.column("w").to_numpy()
        return pa.table(
            {"node": pa.array(np.concatenate([u, v, w]), pa.int64())}
        )

    counts = tris.map_batches(corners, batch_format="pyarrow").groupby(
        "node"
    ).count()
    return counts.map_batches(
        lambda b: pa.table(
            {
                "node": b.column("node").cast(pa.int64()),
                "n_triangles": b.column("count()").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


# ---------------- functional-graph pointer resolution ----------------


def resolve_pointers(
    state,
    node_col: str = "node",
    ptr_col: str = "target",
    max_rounds: int = 40,
    num_partitions: int | None = None,
):
    """Resolve every node of a FUNCTIONAL graph (each node has at most one
    outgoing pointer) to its terminal node — the redirect-chain / symlink /
    union-find-parent resolution primitive a crawl pipeline runs before
    url dedup.

    Input: Dataset of (node int64, target int64-or-null); a null target
    marks a terminal node. Every non-null target must itself appear as a
    node, and chains must be acyclic (a cycle never converges and raises
    after ``max_rounds``).

    Returns a Dataset of (node, final, hops): the terminal each node
    resolves to and the exact chain length walked.

    Scale shape — pointer DOUBLING, not walking: each round executes ONE
    distributed self-join of the 24 B/row state on (ptr == node), after
    which every node's pointer distance doubles; a depth-D chain resolves
    in ceil(log2 D) rounds, so even depth-10^6 chains need 20 joins. The
    state (3 int64 columns) is the only thing that shuffles or
    checkpoints; convergence is detected by an exact changed-row count
    folded into the round's output (no extra pass over the data).

    Hop accounting under doubling: when node i's pointer jumps from p to
    p's pointer, hops(i) += hops(p) — each node's hops always equals the
    true distance to its CURRENT pointer, so at the fixpoint (pointer
    terminal, hops(terminal)=0) it is the full chain length.
    """
    import ray.data

    if num_partitions is None:
        num_partitions = max(8, int(ray.cluster_resources().get("CPU", 8)))

    def _init(b: pa.Table) -> pa.Table:
        node = b.column(node_col).to_numpy().astype(np.int64)
        tgt = b.column(ptr_col).to_numpy(zero_copy_only=False)
        term = pa.compute.is_null(b.column(ptr_col)).to_numpy(
            zero_copy_only=False
        )
        ptr = np.where(term, node, np.where(term, 0, tgt).astype(np.int64))
        hops = np.where(term, 0, 1).astype(np.int64)
        return pa.table(
            {
                "node": pa.array(node, pa.int64()),
                "ptr": pa.array(ptr, pa.int64()),
                "hops": pa.array(hops, pa.int64()),
            }
        )

    n_blocks = max(1, num_partitions)
    cur = (
        state.map_batches(_init, batch_format="pyarrow")
        .repartition(n_blocks)
        .materialize()
    )

    def _lookup(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node2": b.column("node"),
                "ptr2": b.column("ptr"),
                "hops2": b.column("hops"),
            }
        )

    def _advance(b: pa.Table) -> pa.Table:
        ptr = b.column("ptr").to_numpy()
        ptr2 = b.column("ptr2").to_numpy()
        hops = b.column("hops").to_numpy()
        hops2 = b.column("hops2").to_numpy()
        changed = ptr2 != ptr
        return pa.table(
            {
                "node": b.column("node"),
                "ptr": b.column("ptr2"),
                "hops": pa.array(hops + hops2, pa.int64()),
                "__chg": pa.array(changed.astype(np.int64), pa.int64()),
            }
        )

    for _ in range(max_rounds):
        lut = cur.map_batches(_lookup, batch_format="pyarrow")
        nxt = (
            cur.join(
                lut,
                join_type="inner",
                num_partitions=num_partitions,
                on=("ptr",),
                right_on=("node2",),
            )
            .map_batches(_advance, batch_format="pyarrow")
            .repartition(n_blocks)
            .materialize()
        )
        changed = nxt.sum("__chg")
        # lazy off the materialized round output — the column drop re-runs
        # zero-copy from nxt's blocks, no second checkpoint
        cur = nxt.drop_columns(["__chg"])
        if not changed:
            break
    else:
        raise RuntimeError(
            f"resolve_pointers: no convergence after {max_rounds} rounds "
            "(cycle in the pointer graph?)"
        )

    def _final(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                node_col: b.column("node"),
                "final": b.column("ptr"),
                "hops": b.column("hops"),
            }
        )

    return cur.map_batches(_final, batch_format="pyarrow")
