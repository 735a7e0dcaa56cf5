"""Relational pipelines over the TPC-H-style tables: partial-agg groupby,
broadcast dimension join, distributed fact-fact hash join — verified
against in-process pandas on the same parquet."""

import numpy as np
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
