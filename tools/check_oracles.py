"""Driver-mimic: run every queries() entry and its oracle_sql() side-by-side
and compare row count, schema, and values (sorted column-name order,
order-insensitive rows). Usage: python tools/check_oracles.py [sf_dir] [names...]"""

from __future__ import annotations

import sys
import time

import numpy as np
import pandas as pd


def to_df(x) -> pd.DataFrame:
    if isinstance(x, pd.DataFrame):
        return x
    if hasattr(x, "to_pandas"):
        return x.to_pandas()
    raise TypeError(type(x))


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def compare(name: str, ray_df: pd.DataFrame, ora_df: pd.DataFrame) -> str:
    a, b = canon(ray_df), canon(ora_df)
    if list(a.columns) != list(b.columns):
        return f"SCHEMA MISMATCH ray={list(a.columns)} ora={list(b.columns)}"
    if len(a) != len(b):
        return f"ROWCOUNT MISMATCH ray={len(a)} ora={len(b)}"
    issues = []
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind in "fc" or bv.dtype.kind in "fc":
            av = av.astype(np.float64)
            bv = bv.astype(np.float64)
            both_nan = np.isnan(av) & np.isnan(bv)
            eq = (av == bv) | both_nan
            if not eq.all():
                close = np.isclose(av, bv, rtol=1e-9, equal_nan=True)
                n_bad = int((~eq).sum())
                if close.all():
                    issues.append(f"{c}: {n_bad} not bit-exact but close")
                else:
                    worst = np.nanmax(np.abs(av - bv))
                    issues.append(f"{c}: {int((~close).sum())} DIFFER (max {worst})")
        else:
            if not (av == bv).all():
                issues.append(f"{c}: {(av != bv).sum()} values differ")
    return "; ".join(issues) if issues else "OK (bit-exact)"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 log_to_driver=False)

    import duckdb

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ray_df = to_df(fn(sf_dir))
        except Exception as e:
            print(f"{name:26s} RAY ERROR: {type(e).__name__}: {e}")
            failures += 1
            continue
        t1 = time.time()
        sql = oracles.get(name)
        if sql is None:
            print(f"{name:26s} rows-only: {len(ray_df)} rows  ({t1-t0:.1f}s)")
            continue
        try:
            ora_df = con.execute(sql).df()
        except Exception as e:
            print(f"{name:26s} ORACLE SQL ERROR: {e}")
            failures += 1
            continue
        verdict = compare(name, ray_df, ora_df)
        if "OK" not in verdict:
            failures += 1
        print(f"{name:26s} {verdict}  ({t1-t0:.1f}s ray, {time.time()-t1:.1f}s sql, {len(ray_df)} rows)")
    print("FAILURES:", failures)
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
