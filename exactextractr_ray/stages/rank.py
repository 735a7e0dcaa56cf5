"""Group-wise ranking operators.

``top_k_per_group`` is the distributed TOP-K-PER-KEY every corpus pipeline
needs (best page per host, longest docs per source, highest-scoring sample
per stratum). The reference engine has no analog; the SQL semantics are
``ROW_NUMBER() OVER (PARTITION BY g ORDER BY v DESC, tie ASC) <= k``.

Scale shape (the point of the design):

* a **per-batch partial top-k combiner** runs BEFORE the shuffle, so each
  upstream block contributes at most ``k`` rows per group it has seen —
  the exchange volume is O(groups x k x blocks), independent of corpus
  size (the same partial-before-shuffle trick as stats partials in
  pipelines/zonal.py);
* the final reduction shuffles only those survivors, hashed into a fixed
  number of COARSE groups (many keys per group, the repo-wide pattern for
  bounding task count), and applies the identical vectorized selection
  per coarse group.

The selection key ``(v desc|asc, tie asc)`` is a TOTAL order per group, so
the result is independent of partitioning/batching — byte-identical at any
parallelism and bit-exact against the SQL window oracle.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa


def _group_codes(arr: np.ndarray) -> np.ndarray:
    """Dense int codes for an arbitrary-dtype group column."""
    _, codes = np.unique(arr, return_inverse=True)
    return codes


def _select_topk(
    b: pa.Table,
    group_col: str,
    order_col: str,
    tie_col: str,
    k: int,
    ascending: bool,
    emit_rank: bool,
) -> pa.Table:
    """Vectorized top-k-per-group over one in-memory table.

    lexsort with keys (tie, +/-v, group): group is the primary key (runs
    of equal groups), then order value, then the tie-breaker — one sort,
    then a segmented rank via run starts.
    """
    if b.num_rows == 0:
        return b.append_column("rnk", pa.array([], pa.int64())) if emit_rank else b
    g = _group_codes(b.column(group_col).to_numpy(zero_copy_only=False))
    v = b.column(order_col).to_numpy(zero_copy_only=False)
    t = b.column(tie_col).to_numpy(zero_copy_only=False)
    vkey = v if ascending else -v.astype(np.float64) if v.dtype.kind == "f" else -v
    order = np.lexsort((t, vkey, g))
    gs = g[order]
    run_start = np.r_[0, 1 + np.flatnonzero(gs[1:] != gs[:-1])]
    run_len = np.diff(np.r_[run_start, len(gs)])
    rank = np.arange(len(gs)) - np.repeat(run_start, run_len)
    keep = rank < k
    out = b.take(pa.array(order[keep], pa.int64()))
    if emit_rank:
        out = out.append_column(
            "rnk", pa.array(rank[keep] + 1, pa.int64())
        )
    return out


def group_quantiles(
    ds,
    group_col: str,
    value_col: str,
    qs=(0.25, 0.5, 0.75),
    num_coarse_groups: int = 64,
):
    """Exact per-group continuous quantiles (DuckDB ``quantile_cont``
    semantics: linear interpolation at ``q*(n-1)`` over the sorted
    multiset).

    The shuffle carries a COMPRESSED frequency map — per-batch
    (group, value, count) partials via np.unique, merged by groupby-sum —
    so exchange volume is bounded by distinct (group, value) pairs per
    block, not rows (the zonal-median freq-map trick applied
    relationally). Finalize walks each group's sorted (value, count) runs
    with a cumulative-count searchsorted: O(distinct values), never
    expanding the multiset. Output columns: group_col, then ``q{100q:g}``
    per quantile (q50 etc.), float64.
    """
    qs = list(qs)

    def partial(b: pa.Table) -> pa.Table:
        g = b.column(group_col).to_numpy(zero_copy_only=False)
        v = b.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        codes = _group_codes(g)
        key = np.stack([codes.astype(np.float64), v], axis=1)
        pairs, counts = np.unique(key, axis=0, return_counts=True)
        # map codes back to original group values via the sorted uniques
        gvals = np.unique(g)[pairs[:, 0].astype(np.int64)]
        return pa.table(
            {
                group_col: pa.array(gvals),
                "__v": pa.array(pairs[:, 1], pa.float64()),
                "__c": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    def add_coarse(b: pa.Table) -> pa.Table:
        vals = b.column(group_col).to_pylist()
        uniq = {}
        cg = np.empty(len(vals), dtype=np.int64)
        for i, s in enumerate(vals):
            c = uniq.get(s)
            if c is None:
                c = (
                    int.from_bytes(
                        hashlib.md5(str(s).encode()).digest()[:8], "big"
                    )
                    % num_coarse_groups
                )
                uniq[s] = c
            cg[i] = c
        return b.append_column("__cg", pa.array(cg, pa.int64()))

    qcols = [f"q{q * 100:g}" for q in qs]

    def final(b: pa.Table) -> pa.Table:
        g = b.column(group_col).to_numpy(zero_copy_only=False)
        v = b.column("__v").to_numpy()
        c = b.column("sum(__c)").to_numpy().astype(np.int64)
        codes = _group_codes(g)
        order = np.lexsort((v, codes))
        gs, vs, cs = codes[order], v[order], c[order]
        starts = np.r_[0, 1 + np.flatnonzero(gs[1:] != gs[:-1])]
        ends = np.r_[starts[1:], len(gs)]
        uniq_groups = g[order][starts]
        out = {group_col: uniq_groups}
        for q, col in zip(qs, qcols):
            res = np.empty(len(starts), dtype=np.float64)
            for gi, (s, e) in enumerate(zip(starts, ends)):
                cum = np.cumsum(cs[s:e])
                n = cum[-1]
                p = q * (n - 1)
                lo = int(np.floor(p))
                hi = min(lo + 1, int(n) - 1)
                frac = p - lo
                vlo = vs[s + np.searchsorted(cum, lo, side="right")]
                vhi = vs[s + np.searchsorted(cum, hi, side="right")]
                res[gi] = vlo + frac * (vhi - vlo)
            out[col] = res
        t = pa.table(out)
        return t

    reduced = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([group_col, "__v"])
        .sum("__c")
    )
    coarse = reduced.map_batches(add_coarse, batch_format="pyarrow")
    return coarse.groupby("__cg").map_groups(final, batch_format="pyarrow")


def top_k_per_group(
    ds,
    group_col: str,
    order_col: str,
    k: int,
    tie_col: str,
    ascending: bool = False,
    num_coarse_groups: int = 64,
):
    """Exact distributed top-k rows per group, with a 1-based ``rnk`` column.

    (group_col, order_col, tie_col) must totally order rows within a group
    (tie_col unique per group suffices). Partial combiner -> coarse-group
    exact finalize; see module docstring for the scale argument.
    """

    def partial(b: pa.Table) -> pa.Table:
        return _select_topk(
            b, group_col, order_col, tie_col, k, ascending, emit_rank=False
        )

    def add_coarse(b: pa.Table) -> pa.Table:
        vals = b.column(group_col).to_pylist()
        uniq = {}
        cg = np.empty(len(vals), dtype=np.int64)
        for i, s in enumerate(vals):
            c = uniq.get(s)
            if c is None:
                c = (
                    int.from_bytes(
                        hashlib.md5(str(s).encode()).digest()[:8], "big"
                    )
                    % num_coarse_groups
                )
                uniq[s] = c
            cg[i] = c
        return b.append_column("__cg", pa.array(cg, pa.int64()))

    def final(b: pa.Table) -> pa.Table:
        out = _select_topk(
            b, group_col, order_col, tie_col, k, ascending, emit_rank=True
        )
        return out.drop_columns(["__cg"])

    reduced = ds.map_batches(partial, batch_format="pyarrow").map_batches(
        add_coarse, batch_format="pyarrow"
    )
    return reduced.groupby("__cg").map_groups(final, batch_format="pyarrow")


def quantile_gate(
    ds,
    value_col: str,
    q: float = 0.25,
    keep: str = "ge",
    num_coarse_groups: int = 64,
):
    """Filter rows by a GLOBAL exact quantile of ``value_col`` — the
    corpus-relative quality gate ("drop the bottom quartile by score")
    every curation pipeline needs.

    Two phases: (1) the exact corpus quantile via the compressed
    (value, count) frequency-map path of ``group_quantiles`` (one constant
    group — exchange bounded by distinct values per block); (2) the scalar
    threshold broadcasts and the corpus streams through a vectorized
    filter — no second shuffle. ``keep``: 'ge' keeps values >= threshold,
    'le' keeps <= .
    """
    import ray

    import ray.data as _rd

    if not 0.0 <= q <= 1.0:
        raise ValueError(f"quantile_gate: q must be in [0, 1], got {q}")
    if keep not in ("ge", "le"):
        raise ValueError(f"quantile_gate: keep must be 'ge' or 'le', got {keep!r}")
    qcol = f"q{q * 100:g}"

    def tag(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "g": pa.array(np.zeros(b.num_rows, np.int64), pa.int64()),
                value_col: b.column(value_col),
            }
        )

    thr_df = group_quantiles(
        ds.map_batches(tag, batch_format="pyarrow"),
        "g",
        value_col,
        qs=(q,),
        num_coarse_groups=num_coarse_groups,
    ).to_pandas()
    thr = float(thr_df[qcol].iloc[0])
    thr_ref = ray.put(thr)

    def filt(b: pa.Table) -> pa.Table:
        t = ray.get(thr_ref)
        v = b.column(value_col).to_numpy(zero_copy_only=False)
        m = v >= t if keep == "ge" else v <= t
        return b.filter(pa.array(m))

    return ds.map_batches(filt, batch_format="pyarrow")


def percent_rank(ds, value_col: str, out_col: str = "pr"):
    """Attach the SQL ``PERCENT_RANK()`` of ``value_col`` to every row:
    ``(rank - 1) / (n - 1)`` where rank is the first-peer position — the
    standard corpus-relative score normalization.

    Scale shape: pass 1 reduces to a COMPRESSED (value, count) frequency
    map (per-batch np.unique partials, groupby-sum — exchange bounded by
    distinct values per block); the sorted values + cumulative counts
    broadcast once and pass 2 streams with a vectorized searchsorted — no
    row shuffle at all. Broadcast state is O(distinct values) — the
    documented bound (use the histogram-sketch path for unbounded
    continuous domains).
    """
    import ray

    def partial(b: pa.Table) -> pa.Table:
        v = b.column(value_col).to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        vals, cnt = np.unique(v, return_counts=True)
        return pa.table(
            {
                "__v": pa.array(vals, pa.float64()),
                "__c": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    freq = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("__v")
        .sum("__c")
        .to_pandas()
    )
    if len(freq) == 0:  # empty input (to_pandas drops columns on empty)
        freq = pd.DataFrame({"__v": [], "sum(__c)": []})
    freq = freq.sort_values("__v")
    vals = freq["__v"].to_numpy()
    cnt = freq["sum(__c)"].to_numpy(np.int64)
    below = np.r_[0, np.cumsum(cnt)[:-1]]
    n = int(cnt.sum())
    ref = ray.put((vals, below, n))

    def attach(b: pa.Table) -> pa.Table:
        v_sorted, cb, total = ray.get(ref)
        v = b.column(value_col).to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        idx = np.searchsorted(v_sorted, v)
        pr = (
            cb[idx] / np.float64(total - 1)
            if total > 1
            else np.zeros(len(v))
        )
        return b.append_column(out_col, pa.array(pr, pa.float64()))

    return ds.map_batches(attach, batch_format="pyarrow")


def group_pearson(
    ds,
    group_col: str,
    x_col: str,
    y_col: str,
    x_cents: bool = True,
    y_cents: bool = True,
):
    """Exact per-group Pearson correlation of two numeric columns.

    Inputs quantize to integer cents (``round(v*100)``, the repo's money
    contract) so every moment sum is EXACT int64 and order-free; the only
    float ops are the final closed form

        r = (n*Sxy - Sx*Sy) / (sqrt(n*Sxx - Sx^2) * sqrt(n*Syy - Sy^2))

    evaluated on the driver in arbitrary-precision Python ints, converted
    once to double — the identical rounding as the oracle's HUGEINT ->
    DOUBLE cast. Squared-cents sums can exceed int64 on large blocks, so
    per-batch totals accumulate chunk-wise into Python ints and travel as
    DECIMAL STRINGS (one row per group per block — the groupby combine
    re-sums them exactly). Finalize is O(groups) on the driver. Groups
    with zero variance in either column emit NaN."""

    _CHUNK = 8192  # per-chunk int64 sums stay far from overflow; totals
    # accumulate in arbitrary-precision Python ints and travel as strings

    def partial(b: pa.Table) -> pa.Table:
        g = b.column(group_col).to_numpy(zero_copy_only=False)
        x = b.column(x_col).to_numpy(zero_copy_only=False).astype(np.float64)
        y = b.column(y_col).to_numpy(zero_copy_only=False).astype(np.float64)
        xi = (
            np.round(x * 100.0).astype(np.int64)
            if x_cents
            else x.astype(np.int64)
        )
        yi = (
            np.round(y * 100.0).astype(np.int64)
            if y_cents
            else y.astype(np.int64)
        )
        uniq, codes = np.unique(g, return_inverse=True)
        nuq = len(uniq)
        n = np.bincount(codes, minlength=nuq).astype(np.int64)
        arrs = {
            "sx": xi,
            "sy": yi,
            "sxx": xi * xi,
            "syy": yi * yi,
            "sxy": xi * yi,
        }
        totals = {k: [0] * nuq for k in arrs}
        for s in range(0, len(codes), _CHUNK):
            sl = slice(s, s + _CHUNK)
            for k, arr in arrs.items():
                acc = np.zeros(nuq, dtype=np.int64)
                np.add.at(acc, codes[sl], arr[sl])
                tk = totals[k]
                for gi in range(nuq):
                    if acc[gi]:
                        tk[gi] += int(acc[gi])
        return pa.table(
            {
                group_col: pa.array(uniq),
                "n": pa.array(n, pa.int64()),
                **{
                    k: pa.array([str(v) for v in totals[k]], pa.string())
                    for k in arrs
                },
            }
        )

    def combine(gdf):
        import pandas as _pd

        return _pd.DataFrame(
            {
                group_col: [gdf[group_col].iloc[0]],
                "n": [int(gdf["n"].sum())],
                **{
                    k: [str(sum(int(s) for s in gdf[k]))]
                    for k in ("sx", "sy", "sxx", "syy", "sxy")
                },
            }
        )

    red = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(group_col)
        .map_groups(combine, batch_format="pandas")
        .to_pandas()
    )
    rs = []
    for row in red.itertuples(index=False):
        n, sx, sy = int(row.n), int(row.sx), int(row.sy)
        sxx, syy, sxy = int(row.sxx), int(row.syy), int(row.sxy)
        # exact Python-int moments; one correctly-rounded double per term
        num = n * sxy - sx * sy
        dx = n * sxx - sx * sx
        dy = n * syy - sy * sy
        if dx <= 0 or dy <= 0:
            rs.append(float("nan"))
        else:
            rs.append(
                float(num) / (np.sqrt(float(dx)) * np.sqrt(float(dy)))
            )
    out = red[[group_col]].copy()
    out["r"] = np.array(rs, dtype=np.float64)
    return out.sort_values(group_col).reset_index(drop=True)


def mad_outliers(
    ds,
    group_col: str,
    value_col: str,
    k: float = 3.0,
    num_coarse_groups: int = 64,
):
    """Robust per-group outlier flagging: |x - median| > k * MAD, where
    MAD is the median absolute deviation (both medians exact, DuckDB
    ``quantile_cont(0.5)`` interpolation).

    Three passes, ZERO row shuffle: (1) group medians via the compressed
    freq-map ``group_quantiles``; (2) medians broadcast, |x - med| feeds a
    second ``group_quantiles`` for the MAD; (3) both broadcast, rows
    stream through the flag filter. Exchange volume in passes 1-2 is
    bounded by distinct (group, value) pairs per block."""
    import ray

    def med_of(d, col):
        m = group_quantiles(
            d, group_col, col, qs=(0.5,), num_coarse_groups=num_coarse_groups
        ).to_pandas()
        m.columns = [group_col, "med"]
        return dict(zip(m[group_col], m["med"]))

    med = med_of(ds, value_col)
    med_ref = ray.put(med)

    def absdev(b: pa.Table) -> pa.Table:
        m = ray.get(med_ref)
        g = b.column(group_col).to_numpy(zero_copy_only=False)
        v = b.column(value_col).to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        mm = np.array([m[x] for x in g], dtype=np.float64)
        return pa.table(
            {
                group_col: b.column(group_col),
                "absdev": pa.array(np.abs(v - mm), pa.float64()),
            }
        )

    mad = med_of(
        ds.map_batches(absdev, batch_format="pyarrow"), "absdev"
    )
    both_ref = ray.put((med, mad))

    def flag(b: pa.Table) -> pa.Table:
        m, d = ray.get(both_ref)
        g = b.column(group_col).to_numpy(zero_copy_only=False)
        v = b.column(value_col).to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        mm = np.array([m[x] for x in g], dtype=np.float64)
        dd = np.array([d[x] for x in g], dtype=np.float64)
        keep = np.abs(v - mm) > k * dd
        return b.filter(pa.array(keep))

    return ds.map_batches(flag, batch_format="pyarrow")


def grouped_running_total(
    ds,
    group_col: str,
    order_col: str,
    value_col: str,
    num_coarse_groups: int = 64,
):
    """Per-group running total: one row per (group, order) with the
    period value and its cumulative sum in order — the windowed
    ``SUM() OVER (PARTITION BY g ORDER BY o)`` at scale.

    Phase 1 collapses rows to one (group, order) partial per block
    (per-batch np.unique + add.at combiner) and a small groupby-sum —
    the exchange is periods, not rows. Phase 2 hashes groups into coarse
    buckets and runs one vectorized sort + segmented cumsum per bucket.
    Integer values stay exact int64."""

    def partial(b: pa.Table) -> pa.Table:
        g = b.column(group_col).to_numpy(zero_copy_only=False)
        o = b.column(order_col).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        v = b.column(value_col).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        gu, gc = np.unique(g, return_inverse=True)
        pairs, inv = np.unique(
            np.stack([gc.astype(np.int64), o], axis=1),
            axis=0,
            return_inverse=True,
        )
        acc = np.zeros(len(pairs), dtype=np.int64)
        np.add.at(acc, inv, v)
        return pa.table(
            {
                group_col: pa.array(gu[pairs[:, 0]]),
                order_col: pa.array(pairs[:, 1], pa.int64()),
                "pv": pa.array(acc, pa.int64()),
            }
        )

    reduced = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([group_col, order_col])
        .sum("pv")
    )

    def add_coarse(b: pa.Table) -> pa.Table:
        vals = b.column(group_col).to_pylist()
        cg = np.array(
            [
                int.from_bytes(
                    hashlib.md5(str(s).encode()).digest()[:8], "big"
                )
                % num_coarse_groups
                for s in vals
            ],
            dtype=np.int64,
        )
        return b.append_column("__cg", pa.array(cg, pa.int64()))

    def final(b: pa.Table) -> pa.Table:
        g = b.column(group_col).to_numpy(zero_copy_only=False)
        o = b.column(order_col).to_numpy()
        v = b.column("sum(pv)").to_numpy().astype(np.int64)
        codes = _group_codes(g)
        order = np.lexsort((o, codes))
        gs, os_, vs = codes[order], o[order], v[order]
        cum = np.cumsum(vs)
        starts = np.r_[0, 1 + np.flatnonzero(gs[1:] != gs[:-1])]
        # subtract the cumulative total before each group's first row
        base = np.repeat(np.r_[0, cum[starts[1:] - 1]], np.diff(
            np.r_[starts, len(gs)]
        ))
        return pa.table(
            {
                group_col: pa.array(g[order]),
                order_col: pa.array(os_, pa.int64()),
                "period_value": pa.array(vs, pa.int64()),
                "running_total": pa.array(cum - base, pa.int64()),
            }
        )

    return (
        reduced.map_batches(add_coarse, batch_format="pyarrow")
        .groupby("__cg")
        .map_groups(final, batch_format="pyarrow")
    )


def pareto_front(
    ds,
    max_col: str,
    min_col: str,
    id_col: str,
):
    """Distributed SKYLINE (pareto-front) query: rows not dominated by any
    other row, where b dominates a iff b.max_col >= a.max_col AND
    b.min_col <= a.min_col with at least one strict. Exact duplicates of a
    non-dominated (max, min) pair are all kept (neither dominates).

    The skyline decomposition property does the distribution: a row
    dominated within ANY subset is dominated globally, so each block
    reduces to its LOCAL front (vectorized sort + two prefix-min passes,
    no pairwise loop), and one finalize group computes the front of the
    union of local fronts. Exchange is bounded by the local front sizes —
    for real score-like columns that is near the sqrt-law tiny fraction,
    never the input."""

    def _front(price: np.ndarray, date: np.ndarray):
        """Boolean keep-mask of the pareto front (maximize price,
        minimize date), any input order."""
        n = len(price)
        if n == 0:
            return np.zeros(0, dtype=bool)
        order = np.lexsort((date, -price))  # price desc, date asc
        p = price[order]
        d = date[order]
        # group starts: strictly lower price than the previous row
        new_grp = np.ones(n, dtype=bool)
        new_grp[1:] = p[1:] != p[:-1]
        # min date within each equal-price group = date of the group head
        # (rows are date-ascending inside a group)
        grp_head = np.maximum.accumulate(np.where(new_grp, np.arange(n), 0))
        eq_min = d[grp_head]
        # running min date over all STRICTLY-higher-price groups
        run = np.minimum.accumulate(d)
        strict_min = np.full(n, np.inf)
        head_prev = grp_head - 1  # last index of the previous group
        has_prev = head_prev >= 0
        strict_min[has_prev] = run[head_prev[has_prev]]
        keep_sorted = (d == eq_min) & (d < strict_min)
        keep = np.zeros(n, dtype=bool)
        keep[order] = keep_sorted
        return keep

    def local(b: pa.Table) -> pa.Table:
        price = b.column(max_col).to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        date = b.column(min_col).to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        keep = _front(price, date)
        out = b.filter(pa.array(keep))
        return out.append_column(
            "__g", pa.array(np.zeros(out.num_rows, np.int64), pa.int64())
        )

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        keep = _front(
            g[max_col].to_numpy().astype(np.float64),
            g[min_col].to_numpy().astype(np.float64),
        )
        out = g[keep].drop(columns="__g")
        return out.sort_values(
            [max_col, min_col, id_col], ascending=[False, True, True],
            kind="mergesort",
        ).reset_index(drop=True)

    return (
        ds.map_batches(local, batch_format="pyarrow")
        .groupby("__g")
        .map_groups(finalize, batch_format="pandas")
    )


def mann_whitney_u(ds, value_col: str, group_col: str, group_a, group_b):
    """Exact Mann-Whitney U statistic between two groups — the standard
    nonparametric two-sample test (rank-biserial effect size follows as
    u/(n_a*n_b)). Returned in HALF-UNIT-DOUBLED integers so ties (each
    contributing 1/2) stay exact: u2 = 2*U_A.

    Scale shape (the percent_rank pattern): one pass reduces each group
    to a compressed (value, count) frequency map (per-batch np.unique
    partials + groupby-sum; exchange bounded by distinct values), then
    U comes from a single vectorized cumulative pass over the merged
    map — rows never shuffle, and the formula
    U_A = sum_v cntA(v) * (cumB_below(v) + cntB(v)/2) is exactly the
    pairwise-comparison definition."""
    import pyarrow.compute as pc

    def partial(b: pa.Table) -> pa.Table:
        g = b.column(group_col).to_numpy(zero_copy_only=False)
        v = b.column(value_col).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        out_v, out_a, out_b = [], [], []
        for want, sel in ((group_a, 0), (group_b, 1)):
            vv = v[g == want]
            vals, cnt = np.unique(vv, return_counts=True)
            out_v.append(vals)
            out_a.append(cnt if sel == 0 else np.zeros(len(vals), np.int64))
            out_b.append(cnt if sel == 1 else np.zeros(len(vals), np.int64))
        return pa.table(
            {
                "__v": pa.array(np.concatenate(out_v), pa.int64()),
                "__ca": pa.array(
                    np.concatenate(out_a).astype(np.int64), pa.int64()
                ),
                "__cb": pa.array(
                    np.concatenate(out_b).astype(np.int64), pa.int64()
                ),
            }
        )

    freq = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("__v")
        .sum(["__ca", "__cb"])
        .to_pandas()
    )
    freq.columns = ["__v", "ca", "cb"]
    freq = freq.sort_values("__v")
    ca = freq["ca"].to_numpy(np.int64)
    cb = freq["cb"].to_numpy(np.int64)
    cum_b = np.r_[0, np.cumsum(cb)[:-1]]
    u2 = int((ca * (2 * cum_b + cb)).sum())
    return pd.DataFrame(
        {
            "u2": [u2],
            "n_a": [int(ca.sum())],
            "n_b": [int(cb.sum())],
        }
    )


def ks_statistic(ds, value_col: str, group_col: str, group_a, group_b):
    """Exact two-sample Kolmogorov-Smirnov distance: D = max over the
    merged value set of |ECDF_A - ECDF_B|, carried as the exact integer
    cross-multiplication ks_num / (n_a * n_b) with
    ks_num = max |cumA(v)*n_b - cumB(v)*n_a| — no float until the final
    single division. Same compressed frequency-map shape as
    mann_whitney_u."""
    def partial(b: pa.Table) -> pa.Table:
        g = b.column(group_col).to_numpy(zero_copy_only=False)
        v = b.column(value_col).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        out_v, out_a, out_b = [], [], []
        for want, sel in ((group_a, 0), (group_b, 1)):
            vv = v[g == want]
            vals, cnt = np.unique(vv, return_counts=True)
            out_v.append(vals)
            out_a.append(cnt if sel == 0 else np.zeros(len(vals), np.int64))
            out_b.append(cnt if sel == 1 else np.zeros(len(vals), np.int64))
        return pa.table(
            {
                "__v": pa.array(np.concatenate(out_v), pa.int64()),
                "__ca": pa.array(
                    np.concatenate(out_a).astype(np.int64), pa.int64()
                ),
                "__cb": pa.array(
                    np.concatenate(out_b).astype(np.int64), pa.int64()
                ),
            }
        )

    freq = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("__v")
        .sum(["__ca", "__cb"])
        .to_pandas()
    )
    freq.columns = ["__v", "ca", "cb"]
    freq = freq.sort_values("__v")
    ca = freq["ca"].to_numpy(np.int64)
    cb = freq["cb"].to_numpy(np.int64)
    n_a, n_b = int(ca.sum()), int(cb.sum())
    ks_num = int(
        np.abs(np.cumsum(ca) * n_b - np.cumsum(cb) * n_a).max()
    ) if len(ca) else 0
    return pd.DataFrame(
        {
            "ks_num": [ks_num],
            "n_a": [n_a],
            "n_b": [n_b],
            "ks": [ks_num / (n_a * n_b) if n_a and n_b else 0.0],
        }
    )


def spearman_rho(ds, x_col: str, y_col: str):
    """Exact tie-corrected Spearman rank correlation: average ranks
    carried as DOUBLED integers (R = 2*rank_less + cnt_eq + 1, so tie
    midpoints stay integral), all five moment sums exact int64, and
    rho computed as the one closed-form float expression
    (n*Sxy - Sx*Sy) / (sqrt(n*Sx2 - Sx^2) * sqrt(n*Sy2 - Sy^2)) —
    mirrored verbatim by the SQL oracle, so even the float is
    bit-identical.

    Scale shape: two compressed frequency maps (one per column)
    broadcast once (the percent_rank pattern); ranks attach via
    searchsorted; the moment partials are one tiny combine. Rows never
    shuffle."""
    import ray

    def freq_map(col):
        def partial(b: pa.Table) -> pa.Table:
            v = b.column(col).to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            vals, cnt = np.unique(v, return_counts=True)
            return pa.table(
                {
                    "__v": pa.array(vals, pa.int64()),
                    "__c": pa.array(cnt.astype(np.int64), pa.int64()),
                }
            )

        f = (
            ds.map_batches(partial, batch_format="pyarrow")
            .groupby("__v")
            .sum("__c")
            .to_pandas()
        )
        f.columns = ["__v", "c"]
        f = f.sort_values("__v")
        vals = f["__v"].to_numpy(np.int64)
        cnt = f["c"].to_numpy(np.int64)
        less = np.r_[0, np.cumsum(cnt)[:-1]]
        return vals, 2 * less + cnt + 1  # doubled average rank per value

    vx, rx = freq_map(x_col)
    vy, ry = freq_map(y_col)
    ref = ray.put((vx, rx, vy, ry))

    def moments(b: pa.Table) -> pa.Table:
        vx_, rx_, vy_, ry_ = ray.get(ref)
        x = b.column(x_col).to_numpy(zero_copy_only=False).astype(np.int64)
        y = b.column(y_col).to_numpy(zero_copy_only=False).astype(np.int64)
        dx = rx_[np.searchsorted(vx_, x)]
        dy = ry_[np.searchsorted(vy_, y)]
        return pa.table(
            {
                "n": pa.array([len(x)], pa.int64()),
                "sx": pa.array([int(dx.sum())], pa.int64()),
                "sy": pa.array([int(dy.sum())], pa.int64()),
                "sx2": pa.array([int((dx * dx).sum())], pa.int64()),
                "sy2": pa.array([int((dy * dy).sum())], pa.int64()),
                "sxy": pa.array([int((dx * dy).sum())], pa.int64()),
            }
        )

    m = (
        ds.map_batches(moments, batch_format="pyarrow")
        .sum(["n", "sx", "sy", "sx2", "sy2", "sxy"])
    )
    n = int(m["sum(n)"])
    sx, sy = int(m["sum(sx)"]), int(m["sum(sy)"])
    sx2, sy2 = int(m["sum(sx2)"]), int(m["sum(sy2)"])
    sxy = int(m["sum(sxy)"])
    num = float(n * sxy - sx * sy)
    rho = num / (np.sqrt(float(n * sx2 - sx * sx))
                 * np.sqrt(float(n * sy2 - sy * sy)))
    return pd.DataFrame(
        {
            "n": [n], "sx": [sx], "sy": [sy], "sx2": [sx2],
            "sy2": [sy2], "sxy": [sxy], "rho": [rho],
        }
    )


def _count_inversions(y: np.ndarray) -> int:
    """Exact number of strictly-decreasing pairs (i < j, y[i] > y[j])
    via bottom-up merge sort with VECTORIZED cross-block counting:
    log2(n) passes, each one np.searchsorted over the concatenated
    sorted blocks — no Python-per-element work."""
    a = np.asarray(y, np.int64).copy()
    n = len(a)
    inv = 0
    width = 1
    while width < n:
        nxt = np.empty_like(a)
        for lo in range(0, n, 2 * width):
            mid = min(lo + width, n)
            hi = min(lo + 2 * width, n)
            left, right = a[lo:mid], a[mid:hi]
            if len(right):
                # pairs (l, r) with l > r: left is sorted ascending
                pos = np.searchsorted(left, right, side="right")
                inv += int((len(left) - pos).sum())
                merged = np.concatenate([left, right])
                merged.sort(kind="stable")
                nxt[lo:hi] = merged
            else:
                nxt[lo:hi] = left
        a = nxt
        width *= 2
    return inv


def kendall_tau_b(ds, x_col: str, y_col: str):
    """Exact tie-corrected Kendall tau-b: discordant pairs from an
    O(n log n) merge inversion count over y sorted by (x, y), tie-pair
    masses from the frequency maps, concordant by complement — every
    intermediate an exact (Python/big) integer; tau as the one mirrored
    float expression (num / (sqrt(n0-tx)*sqrt(n0-ty))).

    Scale note: the inversion count runs on the collected (x, y) rank
    columns — O(n) driver memory for the two int64 columns (the same
    bound as any exact global rank statistic); the frequency maps and
    moment passes stay distributed. For corpus-scale n use a sampled or
    bucketed variant; exactness is the contract here."""
    t = (
        ds.select_columns([x_col, y_col])
        .to_pandas()
        .sort_values([x_col, y_col], kind="mergesort")
    )
    x = t[x_col].to_numpy(np.int64)
    y = t[y_col].to_numpy(np.int64)
    n = len(x)
    n0 = n * (n - 1) // 2
    disc = _count_inversions(y)

    def tie_mass(v):
        _vals, cnt = np.unique(v, return_counts=True)
        return int((cnt.astype(object) * (cnt - 1) // 2).sum())

    tx = tie_mass(x)
    ty = tie_mass(y)
    # joint ties (equal x AND y): neither concordant nor discordant
    xy = x * (2**32) + y  # values bounded well below 2^31 in our uses
    txy = tie_mass(xy)
    conc = n0 - tx - ty + txy - disc
    num = float(conc - disc)
    tau = num / (np.sqrt(float(n0 - tx)) * np.sqrt(float(n0 - ty)))
    return pd.DataFrame(
        {
            "n": [n], "concordant": [int(conc)], "discordant": [int(disc)],
            "ties_x": [tx], "ties_y": [ty], "ties_xy": [txy],
            "tau_b": [tau],
        }
    )
