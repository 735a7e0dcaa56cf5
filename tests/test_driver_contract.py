"""Driver-contract regression: the driver initializes Ray itself and may run
from ANY working directory — workers must not need the repo on their import
path (guards the by-value pickling registration and the no-runtime-imports
rule for worker code paths)."""

import subprocess
import sys

_CHILD = r"""
import os, sys
os.chdir("/tmp")  # foreign cwd BEFORE ray starts
import ray
ray.init(address="local", num_cpus=4, include_dashboard=False,
         log_to_driver=False, logging_level="ERROR")
sys.path.insert(0, "/root/repo")
import __ray_entry__ as e
qs = e.queries()
r = qs["zonal_stats_rect"]("/root/testdata/sf0.001")
assert len(r) == 12, len(r)
r2 = qs["dedup_exact"]("/root/testdata/sf0.001")
assert len(r2) == 500, len(r2)
ray.shutdown()
print("DRIVER_CONTRACT_OK")
"""


def test_foreign_cwd_driver():
    proc = subprocess.run(
        [sys.executable, "-c", _CHILD], capture_output=True, text=True, timeout=600
    )
    assert "DRIVER_CONTRACT_OK" in proc.stdout, proc.stderr[-3000:]


def test_every_query_has_oracle_or_is_known_approximate():
    """Drift guard: each queries() entry must carry a DuckDB oracle, except
    the known non-SQL ones (verified by tools/check_oracles.py against
    brute force / exact re-derivation / the single-process Sennrich
    reference instead — all deterministic, none unchecked)."""
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e
    from tools.check_oracles import SPECIAL_CHECKS

    APPROX = {"minhash_pairs", "knn_cosine_lsh", "knn_cosine_pq",
              "bpe_train_merges", "bpe_encode_tokens", "strahler_order",
              "simplify_lines", "wordpiece_train_merges",
              "wordpiece_encode_tokens", "unigram_train_pieces",
              "unigram_encode_tokens", "cost_distance", "least_cost_path",
              "sieve_raster", "convex_overlay", "polygon_buffer"}
    # every non-SQL query must have a special check registered
    assert APPROX <= set(SPECIAL_CHECKS)
    q, o = set(e.queries()), set(e.oracle_sql())
    assert o <= q, o - q  # no orphan oracles
    assert q - o == APPROX, q - o
