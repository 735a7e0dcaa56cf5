"""Relational pipelines over the TPC-H-style tables: partial-agg groupby,
broadcast dimension join, distributed fact-fact hash join — verified
against in-process pandas on the same parquet."""

import numpy as np
import pyarrow as pa
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def _ray(ray_session):
    return None


def test_pricing_summary_matches_pandas(_ray):
    from exactextractr_ray.pipelines.relational import pricing_summary

    got = pricing_summary(SF).to_pandas().sort_values(
        ["l_returnflag", "l_linestatus"]
    ).reset_index(drop=True)
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    li = li[li["l_shipdate"] <= pd.Timestamp("1998-09-01")]
    cents = np.round(li["l_extendedprice"].to_numpy() * 100).astype(np.int64)
    pct = np.round((1 - li["l_discount"].to_numpy()) * 100).astype(np.int64)
    ref = (
        pd.DataFrame(
            {
                "l_returnflag": li["l_returnflag"].to_numpy(),
                "l_linestatus": li["l_linestatus"].to_numpy(),
                "sum_qty": li["l_quantity"].to_numpy().astype(np.int64),
                "sum_base_cents": cents,
                "sum_disc_cents_bp": cents * pct,
                "n_rows": 1,
            }
        )
        .groupby(["l_returnflag", "l_linestatus"], as_index=False)
        .sum()
        .sort_values(["l_returnflag", "l_linestatus"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got.astype(ref.dtypes.to_dict()), ref)


def test_revenue_join_matches_pandas(_ray):
    from exactextractr_ray.pipelines.relational import revenue_by_priority

    got = revenue_by_priority(SF).to_pandas().sort_values(
        "o_orderpriority"
    ).reset_index(drop=True)
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    j = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
    cents = np.round(j["l_extendedprice"].to_numpy() * 100).astype(np.int64)
    pct = np.round((1 - j["l_discount"].to_numpy()) * 100).astype(np.int64)
    ref = (
        pd.DataFrame(
            {
                "o_orderpriority": j["o_orderpriority"].to_numpy(),
                "revenue_cents_bp": cents * pct,
                "n_items": 1,
            }
        )
        .groupby("o_orderpriority", as_index=False)
        .sum()
        .sort_values("o_orderpriority")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got.astype(ref.dtypes.to_dict()), ref)


def test_shipping_priority_matches_duckdb(_ray, tmp_path):
    import duckdb

    from exactextractr_ray.pipelines.relational import shipping_priority

    rng = np.random.default_rng(9)
    nc, no, nl = 40, 200, 800
    ck = np.arange(nc, dtype=np.int64)
    seg = np.array(["BUILDING" if i % 2 else "OTHER" for i in range(nc)])
    pa.parquet.write_table(
        pa.table({"c_custkey": ck, "c_mktsegment": seg}),
        tmp_path / "customer.parquet",
    )
    od = (
        np.datetime64("1997-01-01")
        + rng.integers(0, 900, no).astype("timedelta64[D]")
    ).astype("datetime64[us]")
    pa.parquet.write_table(
        pa.table(
            {
                "o_orderkey": np.arange(no, dtype=np.int64),
                "o_custkey": rng.integers(0, nc, no).astype(np.int64),
                "o_orderdate": od,
                "o_orderpriority": np.array(
                    [f"{i%5}-PRI" for i in range(no)]
                ),
            }
        ),
        tmp_path / "orders.parquet",
    )
    sd = (
        np.datetime64("1997-06-01")
        + rng.integers(0, 600, nl).astype("timedelta64[D]")
    ).astype("datetime64[us]")
    pa.parquet.write_table(
        pa.table(
            {
                "l_orderkey": rng.integers(0, no, nl).astype(np.int64),
                "l_extendedprice": np.round(
                    rng.uniform(100, 9000, nl), 2
                ),
                "l_discount": np.round(rng.uniform(0, 0.1, nl), 2),
                "l_shipdate": sd,
            }
        ),
        tmp_path / "lineitem.parquet",
    )

    got = shipping_priority(str(tmp_path)).to_pandas()
    got["o_orderdate_us"] = (
        got["o_orderdate"].astype("datetime64[us]").astype(np.int64)
    )
    got = got[
        ["l_orderkey", "revenue_cents_bp", "o_orderdate_us",
         "o_orderpriority"]
    ].reset_index(drop=True)

    con = duckdb.connect()
    for t in ("customer", "orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{tmp_path}/{t}.parquet')"
        )
    exp = con.execute(
        """
        SELECT l.l_orderkey,
          CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
               * CAST(ROUND((1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT)
            AS revenue_cents_bp,
          epoch_us(o.o_orderdate) AS o_orderdate_us, o.o_orderpriority
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-03-15'
          AND l.l_shipdate > TIMESTAMP '1998-03-15'
        GROUP BY 1, 3, 4
        ORDER BY revenue_cents_bp DESC, o_orderdate_us, l_orderkey
        LIMIT 10
        """
    ).df()
    for c in ("l_orderkey", "revenue_cents_bp", "o_orderdate_us"):
        exp[c] = exp[c].astype(np.int64)
        got[c] = got[c].astype(np.int64)
    pd.testing.assert_frame_equal(got, exp)


def test_local_supplier_volume_vs_duckdb(ray_session):
    """Q5 shape vs a direct DuckDB run on the real sf0.001 tables."""
    import duckdb

    from exactextractr_ray.pipelines.relational import local_supplier_volume

    sf = "/root/testdata/sf0.001"
    got = (
        local_supplier_volume(sf, region="EUROPE", year=1996)
        .to_pandas()
        .sort_values("n_name")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    for t in ("customer", "orders", "lineitem", "supplier", "nation", "region"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    exp = con.execute(
        """
        SELECT n.n_name AS n_name,
          CAST(SUM(CAST(ROUND(l.l_extendedprice*100) AS BIGINT)
                   * CAST(ROUND((1-l.l_discount)*100) AS BIGINT)) AS BIGINT)
            AS revenue_cents_bp,
          CAST(COUNT(*) AS BIGINT) AS n_items
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
                     AND s.s_nationkey = c.c_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        WHERE r.r_name = 'EUROPE'
          AND o.o_orderdate >= DATE '1996-01-01'
          AND o.o_orderdate < DATE '1997-01-01'
        GROUP BY 1 ORDER BY n_name
        """
    ).df()
    for c in ("revenue_cents_bp", "n_items"):
        got[c] = got[c].astype(np.int64)
        exp[c] = exp[c].astype(np.int64)
    pd.testing.assert_frame_equal(got, exp)


def test_local_supplier_volume_unknown_region(ray_session):
    from exactextractr_ray.pipelines.relational import local_supplier_volume

    out = local_supplier_volume(
        "/root/testdata/sf0.001", region="ATLANTIS"
    ).to_pandas()
    assert len(out) == 0


def test_orders_by_nation_path_equivalence(_ray):
    """Round-4 regression: orders_by_nation has two physical plans — the
    broadcast dense-lookup join and (above broadcast_cap) a distributed
    Dataset.join on custkey. Both must be bit-identical to each other and
    to in-process pandas."""
    from exactextractr_ray.pipelines.relational import orders_by_nation

    def run(cap):
        return (
            orders_by_nation(SF, broadcast_cap=cap)
            .to_pandas()
            .sort_values("n_name")
            .reset_index(drop=True)
        )

    broadcast = run(10**9)
    joined = run(0)  # forces the distributed-join plan

    # pandas oracle
    o = pd.read_parquet(f"{SF}/orders.parquet", columns=["o_custkey", "o_totalprice"])
    c = pd.read_parquet(f"{SF}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    n = pd.read_parquet(f"{SF}/nation.parquet", columns=["n_nationkey", "n_name"])
    m = o.merge(c, left_on="o_custkey", right_on="c_custkey").merge(
        n, left_on="c_nationkey", right_on="n_nationkey"
    )
    m["cents"] = np.round(m["o_totalprice"] * 100.0).astype(np.int64)
    exp = (
        m.groupby("n_name", as_index=False)
        .agg(n_orders=("cents", "size"), sum_total_cents=("cents", "sum"))
        .sort_values("n_name")
        .reset_index(drop=True)
    )
    exp["n_orders"] = exp["n_orders"].astype(np.int64)

    pd.testing.assert_frame_equal(broadcast, exp, check_dtype=False)
    pd.testing.assert_frame_equal(joined, exp, check_dtype=False)
