"""Run every `__ray_entry__.queries()` entry against an sf directory and
report row counts + wall time (no oracles — this is the scale-robustness
smoke, complementing tools/check_oracles.py which verifies values at
sf0.01).

Usage: python tools/smoke_all_queries.py [sf_dir] [num_cpus]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(sf_dir: str, num_cpus: int) -> int:
    import ray

    ray.init(
        address="local", num_cpus=num_cpus, include_dashboard=False,
        logging_level="ERROR", log_to_driver=False,
    )
    import __ray_entry__ as e

    fails: list[tuple[str, str]] = []
    for name, fn in e.queries().items():
        t0 = time.time()
        try:
            res = fn(sf_dir)
            n = len(res.to_pandas()) if hasattr(res, "to_pandas") else len(res)
            print(f"{name:28s} {n:>9d} rows  {time.time() - t0:6.1f}s")
        except Exception as ex:  # noqa: BLE001 - smoke reports all failures
            fails.append((name, f"{type(ex).__name__}: {str(ex)[:160]}"))
            print(f"{name:28s} FAIL {type(ex).__name__}")
    print(f"FAILURES: {len(fails)}")
    for name, msg in fails:
        print(f"  {name}: {msg}")
    ray.shutdown()
    return 1 if fails else 0


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    raise SystemExit(main(sf, cpus))
