"""Relational pipelines over the TPC-H-style tables: the canonical Ray Data
shapes for wide aggregation and joins, with integer-exact money math.

These are not reference operators (exactextractr has no relational layer);
they demonstrate that the engine's building blocks — partial aggregation
inside ``map_batches`` before a tiny groupby, broadcast hash joins for small
dimensions, Ray's distributed hash join for fact-fact joins — compose into
ordinary analytics at scale. Money is aggregated in INTEGER cents (and
cent×basis-point products), so sums are exact in any order and every query
hash-matches its DuckDB oracle bit-for-bit despite float inputs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

_CUTOFF = np.datetime64("1998-09-01")


def pricing_summary(sf_dir: str):
    """TPC-H Q1 shape: filter by ship date, aggregate per
    (returnflag, linestatus). Per-batch partial aggregation (vectorized
    pandas groupby inside the map task) means only ~8 partial rows per
    block enter the shuffle."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_returnflag", "l_linestatus", "l_shipdate",
            "l_quantity", "l_extendedprice", "l_discount",
        ],
    )

    def partial(batch: pa.Table) -> pa.Table:
        ship = batch.column("l_shipdate").to_numpy()
        keep = ship <= _CUTOFF
        if not keep.any():
            return pa.table(
                {
                    "l_returnflag": pa.array([], pa.string()),
                    "l_linestatus": pa.array([], pa.string()),
                    "sum_qty": pa.array([], pa.int64()),
                    "sum_base_cents": pa.array([], pa.int64()),
                    "sum_disc_cents_bp": pa.array([], pa.int64()),
                    "n_rows": pa.array([], pa.int64()),
                }
            )
        qty = batch.column("l_quantity").to_numpy()[keep].astype(np.int64)
        cents = np.round(
            batch.column("l_extendedprice").to_numpy()[keep] * 100.0
        ).astype(np.int64)
        pct = np.round(
            (1.0 - batch.column("l_discount").to_numpy()[keep]) * 100.0
        ).astype(np.int64)
        df = pd.DataFrame(
            {
                "l_returnflag": batch.column("l_returnflag").to_numpy(
                    zero_copy_only=False
                )[keep],
                "l_linestatus": batch.column("l_linestatus").to_numpy(
                    zero_copy_only=False
                )[keep],
                "sum_qty": qty,
                "sum_base_cents": cents,
                "sum_disc_cents_bp": cents * pct,
                "n_rows": np.ones(len(qty), dtype=np.int64),
            }
        )
        agg = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).sum()
        return pa.Table.from_pandas(agg, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    out = partials.groupby(["l_returnflag", "l_linestatus"]).sum(
        ["sum_qty", "sum_base_cents", "sum_disc_cents_bp", "n_rows"]
    )
    return out.map_batches(
        lambda b: b.rename_columns(
            ["l_returnflag", "l_linestatus", "sum_qty", "sum_base_cents",
             "sum_disc_cents_bp", "n_rows"]
        ),
        batch_format="pyarrow",
    )


def orders_by_nation(sf_dir: str, broadcast_cap: int = 25_000_000):
    """Orders (fact, streams) x customer x nation aggregation per nation.

    Two physical plans, same result:

    * customer <= ``broadcast_cap`` rows: BROADCAST dimension join — a
      dense custkey -> nation-name lookup array ships once via ``ray.put``
      and every orders batch maps in place (zero shuffle);
    * customer larger (TPC-H customer is FACT-scale, SF*150k rows): a
      distributed ``Dataset.join`` on custkey — both sides hash-shuffle,
      no driver-side or broadcast structure grows with the data. Nation
      (25 rows) stays a broadcast map either way.

    The cap is decided from parquet FOOTER metadata (no data read)."""
    import pyarrow.dataset as pads

    nation = pd.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    nmap = dict(zip(nation["n_nationkey"], nation["n_name"]))

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )
    n_cust = pads.dataset(f"{sf_dir}/customer.parquet").count_rows()

    if n_cust <= broadcast_cap:
        cust = pd.read_parquet(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
        )
        # dense lookup arrays: custkey -> nation name index
        max_ck = int(cust["c_custkey"].max())
        ck2n = np.full(max_ck + 1, -1, dtype=np.int32)
        ck2n[cust["c_custkey"].to_numpy()] = cust["c_nationkey"].to_numpy()
        names = np.array(
            [nmap.get(i, "?") for i in range(ck2n.max() + 1)], dtype=object
        )
        ref = ray.put((ck2n, names))

        def partial(batch: pa.Table) -> pa.Table:
            ck2n_, names_ = ray.get(ref)
            ck = batch.column("o_custkey").to_numpy()
            nk = ck2n_[ck]
            cents = np.round(
                batch.column("o_totalprice").to_numpy() * 100.0
            ).astype(np.int64)
            df = pd.DataFrame(
                {
                    "n_name": names_[nk],
                    "n_orders": np.ones(len(ck), dtype=np.int64),
                    "sum_total_cents": cents,
                }
            )
            agg = df.groupby("n_name", as_index=False).sum()
            return pa.Table.from_pandas(agg, preserve_index=False)

        partials = ds.map_batches(partial, batch_format="pyarrow")
    else:
        cust_ds = ray.data.read_parquet(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
        )
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        joined = ds.join(
            cust_ds,
            join_type="inner",
            num_partitions=ncpu,
            on=("o_custkey",),
            right_on=("c_custkey",),
        )
        names_ref = ray.put(nmap)

        def partial_joined(batch: pa.Table) -> pa.Table:
            nmap_ = ray.get(names_ref)
            nk = batch.column("c_nationkey").to_numpy()
            cents = np.round(
                batch.column("o_totalprice").to_numpy() * 100.0
            ).astype(np.int64)
            df = pd.DataFrame(
                {
                    "n_name": pd.Series(nk).map(nmap_).to_numpy(),
                    "n_orders": np.ones(len(nk), dtype=np.int64),
                    "sum_total_cents": cents,
                }
            )
            agg = df.groupby("n_name", as_index=False).sum()
            return pa.Table.from_pandas(agg, preserve_index=False)

        partials = joined.map_batches(partial_joined, batch_format="pyarrow")
    out = partials.groupby("n_name").sum(["n_orders", "sum_total_cents"])
    return out.map_batches(
        lambda b: b.rename_columns(["n_name", "n_orders", "sum_total_cents"]),
        batch_format="pyarrow",
    )


def revenue_by_priority(sf_dir: str, num_partitions: int | None = None):
    """Fact-fact distributed hash join (Ray Dataset.join): lineitem x orders
    on orderkey, then discounted revenue (integer cents x basis points) per
    order priority. The join shuffles both sides by key — the all-to-all
    shape; the aggregation afterwards is per-batch partial + tiny groupby."""
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    )
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    joined = li.join(
        orders,
        join_type="inner",
        num_partitions=num_partitions or ncpu,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def partial(batch: pa.Table) -> pa.Table:
        cents = np.round(
            batch.column("l_extendedprice").to_numpy() * 100.0
        ).astype(np.int64)
        pct = np.round(
            (1.0 - batch.column("l_discount").to_numpy()) * 100.0
        ).astype(np.int64)
        df = pd.DataFrame(
            {
                "o_orderpriority": batch.column("o_orderpriority").to_numpy(
                    zero_copy_only=False
                ),
                "revenue_cents_bp": cents * pct,
                "n_items": np.ones(batch.num_rows, dtype=np.int64),
            }
        )
        agg = df.groupby("o_orderpriority", as_index=False).sum()
        return pa.Table.from_pandas(agg, preserve_index=False)

    partials = joined.map_batches(partial, batch_format="pyarrow")
    out = partials.groupby("o_orderpriority").sum(
        ["revenue_cents_bp", "n_items"]
    )
    return out.map_batches(
        lambda b: b.rename_columns(
            ["o_orderpriority", "revenue_cents_bp", "n_items"]
        ),
        batch_format="pyarrow",
    )


def orders_return_split(sf_dir: str):
    """Semi/anti-join classification in ONE pass: split orders by whether
    any of their lineitems was returned (l_returnflag = 'R') and aggregate
    (n_orders, total cents) per (o_orderpriority, has_return).

    Scale shape — the tagged-union trick (same as crawl_diff): instead of a
    distributed semi-join PLUS an anti-join (two shuffles of the fact
    table), the returned-orderkey side reduces to per-batch DISTINCT keys,
    both sides tag and union, and one coarse-group shuffle classifies every
    order. Order payloads cross the wire once; lineitem contributes only
    distinct keys per block.
    """
    ngroups = 256

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_returnflag"]
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority", "o_totalprice"],
    )

    def returned_keys(b: pa.Table) -> pa.Table:
        keys = b.column("l_orderkey").to_numpy()[
            b.column("l_returnflag").to_numpy(zero_copy_only=False) == "R"
        ]
        keys = np.unique(keys)
        n = len(keys)
        return pa.table(
            {
                "ckey": pa.array(keys % ngroups, pa.int64()),
                "okey": pa.array(keys, pa.int64()),
                "tag": pa.array(np.ones(n, np.int64), pa.int64()),
                "o_orderpriority": pa.array([""] * n, pa.string()),
                "cents": pa.array(np.zeros(n, np.int64), pa.int64()),
            }
        )

    def order_rows(b: pa.Table) -> pa.Table:
        keys = b.column("o_orderkey").to_numpy()
        cents = np.round(b.column("o_totalprice").to_numpy() * 100.0).astype(
            np.int64
        )
        return pa.table(
            {
                "ckey": pa.array(keys % ngroups, pa.int64()),
                "okey": pa.array(keys, pa.int64()),
                "tag": pa.array(np.zeros(len(keys), np.int64), pa.int64()),
                "o_orderpriority": b.column("o_orderpriority"),
                "cents": pa.array(cents, pa.int64()),
            }
        )

    tagged = li.map_batches(returned_keys, batch_format="pyarrow").union(
        orders.map_batches(order_rows, batch_format="pyarrow")
    )

    def classify(g: pd.DataFrame) -> pd.DataFrame:
        tag = g["tag"].to_numpy()
        ret = np.unique(g["okey"].to_numpy()[tag == 1])
        o = g[tag == 0]
        has = np.isin(o["okey"].to_numpy(), ret, assume_unique=False)
        df = pd.DataFrame(
            {
                "o_orderpriority": o["o_orderpriority"].to_numpy(),
                "has_return": has.astype(np.int64),
                "n_orders": np.ones(len(o), dtype=np.int64),
                "total_cents": o["cents"].to_numpy(),
            }
        )
        return df.groupby(
            ["o_orderpriority", "has_return"], as_index=False
        ).sum()

    partials = tagged.groupby("ckey").map_groups(
        classify, batch_format="pandas"
    )
    out = partials.groupby(["o_orderpriority", "has_return"]).sum(
        ["n_orders", "total_cents"]
    )
    return out.map_batches(
        lambda b: b.rename_columns(
            ["o_orderpriority", "has_return", "n_orders", "total_cents"]
        ),
        batch_format="pyarrow",
    )


def shipping_priority(
    sf_dir: str,
    segment: str = "BUILDING",
    cutoff: str = "1998-03-15",
    k: int = 10,
):
    """TPC-H Q3 shape: customer ⋈ orders ⋈ lineitem with date filters,
    revenue per order, top-k by (revenue DESC, o_orderdate, o_orderkey).

    Scale shape: customers filter to one segment and broadcast ONLY the
    custkey int set (the genuinely small side); orders filter by date +
    segment-membership inside map_batches — no shuffle, never collected.
    Lineitem (the fact table) streams: date filter, per-batch partial
    revenue sums per orderkey, ONE groupby of ~16-byte partial rows.
    The (date, priority) attach is a distributed hash join between that
    per-orderkey aggregate and the filtered orders stream — nothing
    order-sized ever reaches the driver (the round-2 version broadcast a
    full filtered-orders table). Per-block partial top-k + single tiny
    finalize. Money in integer cents x basis points (exact, order-free).
    """
    cut = np.datetime64(cutoff)

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_mktsegment"],
    )

    def cust_keys(b: pa.Table) -> pa.Table:
        keys = b.column("c_custkey").to_numpy()[
            b.column("c_mktsegment").to_numpy(zero_copy_only=False)
            == segment
        ]
        return pa.table({"c_custkey": pa.array(keys, pa.int64())})

    ckeys = np.sort(
        cust.map_batches(cust_keys, batch_format="pyarrow")
        .to_pandas()["c_custkey"]
        .to_numpy()
    )
    ckeys_ref = ray.put(ckeys)

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
    )

    def order_rows(b: pa.Table) -> pa.Table:
        ck = ray.get(ckeys_ref)
        od = b.column("o_orderdate").to_numpy()
        keep = od < cut
        oc = b.column("o_custkey").to_numpy()[keep]
        idx = np.searchsorted(ck, oc)
        idx[idx >= len(ck)] = 0
        member = len(ck) > 0
        sel = (ck[idx] == oc) if member else np.zeros(len(oc), bool)
        t = b.filter(pa.array(keep))
        return t.filter(pa.array(sel)).select(
            ["o_orderkey", "o_orderdate", "o_orderpriority"]
        )

    ords = orders.map_batches(order_rows, batch_format="pyarrow")

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def li_partial(b: pa.Table) -> pa.Table:
        sd = b.column("l_shipdate").to_numpy()
        keep = sd > cut
        ok = b.column("l_orderkey").to_numpy()[keep].astype(np.int64)
        if len(ok) == 0:
            return pa.table(
                {
                    "l_orderkey": pa.array([], pa.int64()),
                    "revenue_cents_bp": pa.array([], pa.int64()),
                }
            )
        cents = np.round(
            b.column("l_extendedprice").to_numpy()[keep] * 100.0
        ).astype(np.int64)
        pct = np.round(
            (1.0 - b.column("l_discount").to_numpy()[keep]) * 100.0
        ).astype(np.int64)
        rev = cents * pct
        uk, inv = np.unique(ok, return_inverse=True)
        sums = np.zeros(len(uk), dtype=np.int64)
        np.add.at(sums, inv, rev)
        return pa.table(
            {
                "l_orderkey": pa.array(uk, pa.int64()),
                "revenue_cents_bp": pa.array(sums, pa.int64()),
            }
        )

    agg = (
        li.map_batches(li_partial, batch_format="pyarrow")
        .groupby("l_orderkey")
        .sum("revenue_cents_bp")
        .map_batches(
            lambda b: b.rename_columns(["l_orderkey", "revenue_cents_bp"]),
            batch_format="pyarrow",
        )
    )

    ncpu = int(ray.cluster_resources().get("CPU", 8))
    rev = agg.join(
        ords,
        join_type="inner",
        num_partitions=ncpu,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def topk(b: pa.Table) -> pa.Table:
        ok = b.column("l_orderkey").to_numpy().astype(np.int64)
        r = b.column("revenue_cents_bp").to_numpy().astype(np.int64)
        od = b.column("o_orderdate").to_numpy()
        op = b.column("o_orderpriority").to_numpy(zero_copy_only=False)
        order = np.lexsort((ok, od, -r))[:k]
        return pa.table(
            {
                "g": pa.array(np.zeros(len(order), np.int64), pa.int64()),
                "l_orderkey": pa.array(ok[order], pa.int64()),
                "revenue_cents_bp": pa.array(r[order], pa.int64()),
                "o_orderdate": pa.array(od[order].astype("datetime64[us]")),
                "o_orderpriority": pa.array(op[order], pa.string()),
            }
        )

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["revenue_cents_bp", "o_orderdate", "l_orderkey"],
            ascending=[False, True, True],
            kind="mergesort",
        ).head(k)
        return g[
            ["l_orderkey", "revenue_cents_bp", "o_orderdate",
             "o_orderpriority"]
        ].reset_index(drop=True)

    return (
        rev.map_batches(topk, batch_format="pyarrow")
        .groupby("g")
        .map_groups(finalize, batch_format="pandas")
    )


def local_supplier_volume(sf_dir: str, region: str = "ASIA", year: int = 1997):
    """TPC-H Q5 shape: revenue from lineitems where the CUSTOMER's and the
    SUPPLIER's nation coincide, within one region and one order year.

    Distributed plan (the Q5 textbook shape, Ray-Data-first):

    * region |><| nation reduce DRIVER-side to a ~25-entry nationkey->name
      map (dims are O(100) rows at any scale);
    * supplier reduces to a suppkey->nationkey int map, broadcast via
      ``ray.put`` (supplier is ~1% of lineitem; at the scale where even
      that map outgrows worker heaps, swap this stage for a third shuffle
      join — the rest of the plan is unchanged);
    * customer |><| orders: SHUFFLE hash join on custkey (both sides big),
      emitting only (o_orderkey, cust_nation);
    * lineitem maps supp_nation in-batch from the broadcast, then SHUFFLE
      hash joins the order stream on orderkey — the single fact-sized
      exchange; the nation-equality filter and the integer-cents revenue
      partial collapse each batch before the final ~25-group sum.
    """
    nation = pd.read_parquet(f"{sf_dir}/nation.parquet")
    reg = pd.read_parquet(f"{sf_dir}/region.parquet")
    rkey = reg.loc[reg["r_name"] == region, "r_regionkey"]
    nat = nation[nation["n_regionkey"].isin(rkey)]
    nation_name = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))
    if not nation_name:
        # dims are driver-side, so an empty region short-circuits before
        # any fact-table work (an empty join side would also lose its
        # schema under the hash-shuffle join)
        return ray.data.from_arrow(
            pa.table(
                {
                    "n_name": pa.array([], pa.string()),
                    "revenue_cents_bp": pa.array([], pa.int64()),
                    "n_items": pa.array([], pa.int64()),
                }
            )
        )

    supp = pd.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    supp_map_ref = ray.put(
        dict(zip(supp["s_suppkey"].astype(int), supp["s_nationkey"].astype(int)))
    )
    nation_ref = ray.put(nation_name)

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    )

    t0 = np.datetime64(f"{year}-01-01")
    t1 = np.datetime64(f"{year + 1}-01-01")

    def order_year(b: pa.Table) -> pa.Table:
        d = b.column("o_orderdate").to_numpy()
        keep = (d >= t0) & (d < t1)
        f = b.filter(pa.array(keep))
        return pa.table(
            {
                "o_orderkey": f.column("o_orderkey").cast(pa.int64()),
                "o_custkey": f.column("o_custkey").cast(pa.int64()),
            }
        )

    ncpu = int(ray.cluster_resources().get("CPU", 8))
    ord_cust = orders.map_batches(order_year, batch_format="pyarrow").join(
        cust,
        join_type="inner",
        num_partitions=ncpu,
        on=("o_custkey",),
        right_on=("c_custkey",),
    )

    def keep_region_cust(b: pa.Table) -> pa.Table:
        names = ray.get(nation_ref)
        nk = b.column("c_nationkey").to_numpy().astype(np.int64)
        keep = np.isin(nk, np.fromiter(names.keys(), np.int64, len(names)))
        f = b.filter(pa.array(keep))
        return pa.table(
            {
                "o_orderkey": f.column("o_orderkey"),
                "cust_nation": f.column("c_nationkey").cast(pa.int64()),
            }
        )

    ord_nation = ord_cust.map_batches(keep_region_cust, batch_format="pyarrow")

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    class SuppNation:
        """Actor-pool stage: the suppkey->nationkey broadcast is fetched
        ONCE per actor (zero-copy from the local object store), not per
        batch."""

        def __init__(self):
            m = ray.get(supp_map_ref)
            keys = np.fromiter(m.keys(), np.int64, len(m))
            vals = np.fromiter(m.values(), np.int64, len(m))
            order = np.argsort(keys)
            self.keys = keys[order]
            self.vals = vals[order]

        def __call__(self, b: pa.Table) -> pa.Table:
            sk = b.column("l_suppkey").to_numpy().astype(np.int64)
            idx = np.searchsorted(self.keys, sk)
            idx = np.clip(idx, 0, len(self.keys) - 1)
            nk = np.where(self.keys[idx] == sk, self.vals[idx], -1)
            t = b.append_column("supp_nation", pa.array(nk, pa.int64()))
            return t.filter(pa.array(nk >= 0))

    li_n = li.map_batches(
        SuppNation, batch_format="pyarrow", concurrency=(1, max(2, ncpu // 2))
    )

    joined = li_n.join(
        ord_nation,
        join_type="inner",
        num_partitions=ncpu,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def partial(b: pa.Table) -> pa.Table:
        names = ray.get(nation_ref)
        cn = b.column("cust_nation").to_numpy().astype(np.int64)
        sn = b.column("supp_nation").to_numpy().astype(np.int64)
        keep = cn == sn
        if not keep.any():
            return pa.table(
                {
                    "n_name": pa.array([], pa.string()),
                    "revenue_cents_bp": pa.array([], pa.int64()),
                    "n_items": pa.array([], pa.int64()),
                }
            )
        cents = np.round(
            b.column("l_extendedprice").to_numpy()[keep] * 100.0
        ).astype(np.int64)
        pct = np.round(
            (1.0 - b.column("l_discount").to_numpy()[keep]) * 100.0
        ).astype(np.int64)
        df = pd.DataFrame(
            {
                "n_name": [names[k] for k in cn[keep]],
                "revenue_cents_bp": cents * pct,
                "n_items": np.ones(int(keep.sum()), np.int64),
            }
        )
        agg = df.groupby("n_name", as_index=False).sum()
        return pa.Table.from_pandas(agg, preserve_index=False)

    out = joined.map_batches(partial, batch_format="pyarrow")
    final = out.groupby("n_name").sum(["revenue_cents_bp", "n_items"])
    return final.map_batches(
        lambda b: b.rename_columns(["n_name", "revenue_cents_bp", "n_items"]),
        batch_format="pyarrow",
    )


def order_priority_semi(sf_dir: str, date_lo="1996-01-01", date_hi="1996-07-01"):
    """TPC-H Q4 shape (order-priority checking): COUNT(*) per
    o_orderpriority over orders in a date window that have AT LEAST ONE
    returned lineitem — the distributed SEMI-JOIN pattern: the probe side
    reduces to DISTINCT keys first (groupby(l_orderkey).count() — exchange
    is O(distinct keys), never lineitem rows), then one hash join against
    the date-filtered orders projection, then a tiny groupby-count.

    (The synthetic lineitem has no l_commitdate/l_receiptdate, so the
    EXISTS predicate is l_returnflag = 'R'; the plan shape is Q4's.)
    """
    import ray

    import numpy as np

    lo = np.datetime64(date_lo, "us")
    hi = np.datetime64(date_hi, "us")

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_returnflag"]
    )

    def returned_keys(b: pa.Table) -> pa.Table:
        m = pc.equal(b.column("l_returnflag"), "R")
        keys = b.filter(m).column("l_orderkey")
        import numpy as _np

        u = _np.unique(keys.to_numpy())
        return pa.table({"l_orderkey": pa.array(u, pa.int64())})

    keys = (
        li.map_batches(returned_keys, batch_format="pyarrow")
        .groupby("l_orderkey")
        .count()
    )

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    )

    def window(b: pa.Table) -> pa.Table:
        od = b.column("o_orderdate").to_numpy()
        m = (od >= lo) & (od < hi)
        return b.filter(pa.array(m))

    orders = orders.map_batches(window, batch_format="pyarrow")
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    joined = orders.join(
        keys,
        join_type="inner",
        num_partitions=max(2, min(16, ncpu // 2)),
        on=("o_orderkey",),
        right_on=("l_orderkey",),
    )
    agg = joined.groupby("o_orderpriority").count()

    def finalize(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderpriority": b.column("o_orderpriority"),
                "order_count": b.column(1).cast(pa.int64()),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


def customers_without_orders(sf_dir: str, priority: str = "1-URGENT"):
    """Anti join (TPC-H Q22 flavor): customers that placed no order of
    the given priority, aggregated per market segment.

    100-TB shape: the probe side (orders) is filtered AT THE READ and
    reduced to DISTINCT custkeys with per-batch partial dedup BEFORE
    the shuffle (exchange O(distinct keys), not O(orders)), then a
    distributed left_outer ``Dataset.join`` marks matches and the anti
    rows survive a null filter — never a driver-side key set."""
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_mktsegment", "c_acctbal"],
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderpriority"],
    )

    def distinct_partial(b: pa.Table) -> pa.Table:
        mask = pa.compute.equal(b.column("o_orderpriority"), priority)
        keys = np.unique(b.filter(mask).column("o_custkey").to_numpy())
        return pa.table({"o_custkey": pa.array(keys, pa.int64()),
                         "one": pa.array(np.ones(len(keys), np.int64))})

    probe = (
        orders.map_batches(distinct_partial, batch_format="pyarrow")
        .groupby("o_custkey")
        .max("one")
    )
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    joined = cust.join(
        probe,
        join_type="left_outer",
        num_partitions=max(2, min(16, ncpu // 2)),
        on=("c_custkey",),
        right_on=("o_custkey",),
    )

    def partial(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        flag = df[df.columns[-1]]  # the probe marker column
        anti = df[flag.isna()]
        cents = np.round(anti["c_acctbal"].to_numpy() * 100.0).astype(
            np.int64
        )
        out = pd.DataFrame(
            {
                "c_mktsegment": anti["c_mktsegment"].to_numpy(),
                "n_customers": np.ones(len(anti), np.int64),
                "acctbal_cents": cents,
            }
        ).groupby("c_mktsegment", as_index=False).sum()
        return pa.Table.from_pandas(out, preserve_index=False)

    agg = joined.map_batches(partial, batch_format="pyarrow").groupby(
        "c_mktsegment"
    ).sum(["n_customers", "acctbal_cents"])
    return agg.map_batches(
        lambda b: b.rename_columns(
            ["c_mktsegment", "n_customers", "acctbal_cents"]
        ),
        batch_format="pyarrow",
    )


def cube_order_counts(sf_dir: str):
    """GROUP BY CUBE(status, priority): all four grouping sets from ONE
    shuffle — the base (status, priority) aggregate is tiny (<= 15
    rows), so the three rollups derive from it driver-side; rolled-up
    dimensions carry the 'ALL' marker."""
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderstatus", "o_orderpriority", "o_totalprice"],
    )

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "o_orderstatus": b.column("o_orderstatus").to_numpy(
                    zero_copy_only=False
                ),
                "o_orderpriority": b.column("o_orderpriority").to_numpy(
                    zero_copy_only=False
                ),
                "n_orders": np.ones(b.num_rows, np.int64),
                "total_cents": np.round(
                    b.column("o_totalprice").to_numpy() * 100.0
                ).astype(np.int64),
            }
        )
        agg = df.groupby(
            ["o_orderstatus", "o_orderpriority"], as_index=False
        ).sum()
        return pa.Table.from_pandas(agg, preserve_index=False)

    base = (
        orders.map_batches(partial, batch_format="pyarrow")
        .groupby(["o_orderstatus", "o_orderpriority"])
        .sum(["n_orders", "total_cents"])
        .to_pandas()
    )
    base.columns = ["o_orderstatus", "o_orderpriority", "n_orders",
                    "total_cents"]
    outs = [base]
    for dims in (["o_orderstatus"], ["o_orderpriority"], []):
        roll = (
            base.groupby(dims, as_index=False)[["n_orders", "total_cents"]]
            .sum()
            if dims
            else pd.DataFrame(
                {
                    "n_orders": [base["n_orders"].sum()],
                    "total_cents": [base["total_cents"].sum()],
                }
            )
        )
        for col in ("o_orderstatus", "o_orderpriority"):
            if col not in roll.columns:
                roll[col] = "ALL"
        outs.append(roll[["o_orderstatus", "o_orderpriority", "n_orders",
                          "total_cents"]])
    out = pd.concat(outs, ignore_index=True)
    return out.sort_values(
        ["o_orderstatus", "o_orderpriority"]
    ).reset_index(drop=True)


def first_orderkeys_concat(sf_dir: str, k: int = 3):
    """Order-SENSITIVE aggregation (STRING_AGG ... ORDER BY): the k
    smallest orderkeys per priority, concatenated in ascending order.

    100-TB shape: per-batch partial top-k (each batch emits <= k rows
    per group) -> tiny groupby -> final top-k + concat in the
    finalizer; exchange O(groups x k), the ordered-aggregate analogue
    of the partial top-k used by tfidf/bm25."""
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderpriority", "o_orderkey"],
    )

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "o_orderpriority": b.column("o_orderpriority").to_numpy(
                    zero_copy_only=False
                ),
                "o_orderkey": b.column("o_orderkey").to_numpy(),
            }
        )
        top = (
            df.sort_values("o_orderkey")
            .groupby("o_orderpriority", as_index=False)
            .head(k)
        )
        return pa.Table.from_pandas(top, preserve_index=False)

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        keys = np.sort(g["o_orderkey"].to_numpy())[:k]
        return pd.DataFrame(
            {
                "o_orderpriority": [g["o_orderpriority"].iloc[0]],
                "first_keys": [",".join(str(int(v)) for v in keys)],
            }
        )

    out = (
        orders.map_batches(partial, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .map_groups(finalize, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("o_orderpriority").reset_index(drop=True)
