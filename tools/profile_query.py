"""Per-stage profile of a registered query: run it once and print Ray
Data's executor stats (stage wall time, task counts, exchanged rows) for
every Dataset the query materialized.

Usage: python tools/profile_query.py <query_name> [sf_dir] [num_cpus]

The ds.stats() text is the evidence format PERF.md cites — this tool makes
regenerating it one command instead of an ad-hoc script.
"""

from __future__ import annotations

import sys
import time


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        sys.exit(2)
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 16

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=cpus, include_dashboard=False,
            log_to_driver=False,
        )

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    if name not in qs:
        print(f"unknown query {name!r}; available: {sorted(qs)}")
        sys.exit(2)

    t0 = time.time()
    out = qs[name](sf_dir)
    wall = time.time() - t0

    import pandas as pd
    import ray.data

    if isinstance(out, ray.data.Dataset):
        df = out.to_pandas()
        print(out.stats())
    elif isinstance(out, pd.DataFrame):
        df = out
        print("(query returns a pandas DataFrame — per-stage stats are "
              "printed by any Dataset it materialized above via Ray logs; "
              "re-run with RAY_DATA_VERBOSE_STATS=1 for more)")
    else:
        df = out.to_pandas()
    print(f"\n{name}: {wall:.2f}s wall, {len(df)} rows, "
          f"{cpus} cpus, sf={sf_dir}")
    ray.shutdown()


if __name__ == "__main__":
    main()
