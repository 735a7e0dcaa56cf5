"""Microbench for VERDICT r02 task #2: exact_dedup finalize strategies on a
synthetic corpus with ~100k DISTINCT content hashes.

Compares the round-2 per-group map_groups finalize (one interpreted Python
call + one 1-row DataFrame per distinct hash) against the round-3 shipped
strategy (per-block vectorized partial combine + 256 coarse groups with a
vectorized pandas groupby each) and Ray's native groupby().aggregate.
Usage:

    python tools/bench_dedup_finalize.py [n_distinct] [dup_factor]
"""

from __future__ import annotations

import sys
import time

import numpy as np
import pandas as pd
import pyarrow as pa


def main():
    n_distinct = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    dup = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    import ray
    import ray.data
    from ray.data.aggregate import Count, Min

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 log_to_driver=False, logging_level="ERROR")
    ray.data.DataContext.get_current().enable_progress_bars = False

    # pre-hashed input (both strategies consume identical (hash, id) rows;
    # the hash stage is shared and not what this bench measures)
    n = n_distinct * dup
    rng = np.random.default_rng(0)
    ids = rng.permutation(n).astype(np.int64)
    import hashlib

    uniq = [hashlib.md5(str(j).encode()).hexdigest() for j in range(n_distinct)]
    hashes = np.array([uniq[i % n_distinct] for i in range(n)])

    def make_ds():
        return ray.data.from_arrow(
            pa.table(
                {
                    "content_hash": pa.array(hashes, pa.string()),
                    "doc_id": pa.array(ids, pa.int64()),
                }
            )
        ).repartition(32)

    # warm the worker pool
    make_ds().map_batches(lambda b: b).count()

    def pick_keeper(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "content_hash": [g["content_hash"].iloc[0]],
                "keeper_id": [int(g["doc_id"].min())],
                "n_dups": [len(g)],
            }
        )

    t0 = time.time()
    old = (
        make_ds()
        .groupby("content_hash")
        .map_groups(pick_keeper, batch_format="pandas")
        .count()
    )
    t_old = time.time() - t0

    t0 = time.time()
    native = (
        make_ds()
        .groupby("content_hash")
        .aggregate(Min("doc_id", alias_name="keeper_id"),
                   Count(alias_name="n_dups"))
        .count()
    )
    t_native = time.time() - t0

    # shipped strategy: per-block partial combine + coarse-group finalize
    ncoarse = 256

    def partial(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        agg = df.groupby("content_hash", as_index=False).agg(
            keeper_id=("doc_id", "min"), n_dups=("doc_id", "size")
        )
        ck = np.array(
            [int(h[:4], 16) % ncoarse for h in agg["content_hash"]],
            dtype=np.int64,
        )
        return pa.table(
            {
                "content_hash": pa.array(agg["content_hash"], pa.string()),
                "keeper_id": pa.array(agg["keeper_id"].to_numpy(np.int64)),
                "n_dups": pa.array(agg["n_dups"].to_numpy(np.int64)),
                "ckey": pa.array(ck, pa.int64()),
            }
        )

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("content_hash", as_index=False).agg(
            keeper_id=("keeper_id", "min"), n_dups=("n_dups", "sum")
        )
        return out.astype({"keeper_id": np.int64, "n_dups": np.int64})

    t0 = time.time()
    new = (
        make_ds()
        .map_batches(partial, batch_format="pyarrow")
        .groupby("ckey")
        .map_groups(finalize, batch_format="pandas")
        .count()
    )
    t_new = time.time() - t0

    assert old == native == new == n_distinct, (old, native, new, n_distinct)
    print(
        f"n_distinct={n_distinct} dup_factor={dup}: "
        f"map_groups finalize {t_old:.2f}s, native aggregate {t_native:.2f}s, "
        f"partial+coarse (shipped) {t_new:.2f}s, "
        f"speedup {t_old / t_new:.1f}x vs map_groups"
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
