"""Capture per-stage ds.stats() for the headline pipelines (PERF.md source).

Runs the same workloads as bench.py (steady-state sizes) and dumps the Ray
Data executor's per-operator wall/cpu/udf timings so the 'is wall-time
dominated by useful compute?' question is answered from measurements, not
guesses.

Usage: RAY_GRAFT_CPUS=32 python tools/stage_stats.py [outfile]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
ZONAL_N = int(os.environ.get("GRAFT_ZONAL_N", "65536"))


def main(out_path: str) -> None:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=NUM_CPUS, include_dashboard=False,
            logging_level="ERROR", log_to_driver=False,
        )
    import logging

    import ray.data

    logging.getLogger("ray.data").setLevel(logging.ERROR)
    ray.data.DataContext.get_current().enable_progress_bars = False
    # warm the worker pool so stats measure the pipelines, not process spawn
    ray.data.range(1000, override_num_blocks=NUM_CPUS * 2).map_batches(
        lambda b: b
    ).count()

    sections: list[tuple[str, float, str]] = []

    # ---- zonal headline (65536^2 cells, 64 zones) ----
    from exactextractr_ray.pipelines.zonal import exact_extract
    from exactextractr_ray.sources.raster import synthetic_raster_dataset
    from exactextractr_ray.sources.zones import synth_rect_zones

    rd = synthetic_raster_dataset(n=ZONAL_N, tile=512)
    zones = synth_rect_zones(64, ZONAL_N)
    sink: dict = {}
    t0 = time.time()
    exact_extract(
        rd, zones, ["count", "sum", "mean", "min", "max", "stdev"],
        concurrency=(1, NUM_CPUS), stats_sink=sink,
    )
    sections.append(("zonal_stats (steady-state headline)", time.time() - t0,
                     sink["stats"]))

    # ---- pip join (40M points x 64 geo zones) ----
    import pyarrow as pa

    from exactextractr_ray import synth
    from exactextractr_ray.sources.zones import synth_geo_zones
    from exactextractr_ray.stages.pip_join import pip_join

    def gen_points(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy()
        lon, lat = synth.geocode_ids(ids)
        return pa.table({
            "pid": pa.array(ids, pa.int64()),
            "lon": pa.array(lon),
            "lat": pa.array(lat),
        })

    pts = ray.data.range(
        40_000_000, override_num_blocks=NUM_CPUS * 4
    ).map_batches(gen_points, batch_format="pyarrow")
    t0 = time.time()
    joined = pip_join(
        pts, synth_geo_zones(64), concurrency=(1, NUM_CPUS)
    ).materialize()
    sections.append(("pip_join (40M points)", time.time() - t0, joined.stats()))

    # ---- minhash LSH near-dup pairs over sf documents ----
    from exactextractr_ray.stages.dedup import minhash_lsh_pairs

    docs = ray.data.read_parquet(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
    )
    t0 = time.time()
    mh = minhash_lsh_pairs(docs, threshold=0.5).materialize()
    sections.append(("minhash_lsh_pairs", time.time() - t0, mh.stats()))

    # ---- brute-force kNN over sf embeddings ----
    from exactextractr_ray.stages.knn import knn_cosine

    emb = ray.data.read_parquet(f"{SF_DIR}/embeddings.parquet")
    qdf = emb.limit(16).to_pandas()
    qmat = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    t0 = time.time()
    kn = knn_cosine(emb, qdf["vec_id"].to_numpy(), qmat, k=10).materialize()
    sections.append(("knn_cosine (16 queries)", time.time() - t0, kn.stats()))

    with open(out_path, "w") as f:
        f.write(f"# ds.stats() capture — num_cpus={NUM_CPUS}, "
                f"zonal_n={ZONAL_N}, sf={SF_DIR}\n\n")
        for name, wall, stats in sections:
            f.write(f"\n{'=' * 70}\n== {name}: wall {wall:.2f}s\n{'=' * 70}\n")
            f.write(stats)
            f.write("\n")
    print(f"wrote {out_path}")
    for name, wall, _ in sections:
        print(f"  {name}: {wall:.2f}s")
    ray.shutdown()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/stage_stats.txt")
