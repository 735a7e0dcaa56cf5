"""PQ recall/cost frontier (the sweep_lsh_recall.py analog for product
quantization): measures recall@k of knn_cosine_pq vs brute-force cosine
over the sf embeddings for a (m, ks, refine) grid, plus the compression
ratio (dim*8 bytes -> m bytes/vector) and the re-rank candidate fraction.

Usage: python tools/sweep_pq_recall.py [sf_dir] [k]
"""
from __future__ import annotations

import sys

import numpy as np
import ray

sys.path.insert(0, "/root/repo")


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)
    from exactextractr_ray.stages.knn import knn_cosine, knn_cosine_pq

    emb = ray.data.read_parquet(f"{sf}/embeddings.parquet")
    n = emb.count()
    dim = len(emb.take(1)[0]["embedding"])
    nq = 64
    qrows = emb.sort("vec_id").limit(nq).take_all()
    qids = np.asarray([r["vec_id"] for r in qrows], np.int64)
    qmat = np.asarray([r["embedding"] for r in qrows], np.float64)
    base = knn_cosine(emb, qids, qmat, k=k).to_pandas()
    truth = {
        int(q): set(base[base.query_id == q].neighbor_id) for q in qids
    }
    print(f"# corpus n={n} dim={dim} queries={nq} k={k}")
    print("m\tks\trefine\trecall\tcompress\tscan_frac")
    for m in (4, 8, 16):
        if dim % m:
            continue
        for ks in (16, 64):
            for refine in (2, 4, 8):
                got = knn_cosine_pq(
                    emb, qids, qmat, k=k, m=m, ks=ks, refine=refine
                ).to_pandas()
                rec = np.mean([
                    len(truth[int(q)]
                        & set(got[got.query_id == q].neighbor_id))
                    / max(1, len(truth[int(q)]))
                    for q in qids
                ])
                comp = dim * 8 / m
                frac = min(1.0, refine * (k + 1) / n)
                print(f"{m}\t{ks}\t{refine}\t{rec:.3f}\t{comp:.0f}x"
                      f"\t{frac:.3f}")
    ray.shutdown()


if __name__ == "__main__":
    main()
