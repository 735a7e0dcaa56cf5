"""LSH-ANN recall/cost frontier (VERDICT r02 task #9): sweep num_planes x
probe_hamming on the sf embeddings table and report recall@k vs brute force
plus the two cost measures that matter at scale:

* scan_frac  — fraction of corpus vectors a query's probed buckets contain
  (the in-memory knn_cosine_lsh scan cost);
* part_frac  — fraction of the 2^num_planes IVF partitions read (the
  knn_cosine_ivf storage-pruning cost; same planes, same probes, so recall
  is identical to the scan path by construction).

The sweep re-derives bucket membership with the SAME RandomHyperplaneLSH +
hamming_probes the pipelines use (asserted identical in
tools/check_oracles.py), so it is exact, not a simulation.

Usage: python tools/sweep_lsh_recall.py [sf_dir] [num_queries] [k]
"""

from __future__ import annotations

import sys

import numpy as np
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

from exactextractr_ray.stages.knn import RandomHyperplaneLSH, hamming_probes


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    nq = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    emb = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pandas()
    ids = emb["vec_id"].to_numpy().astype(np.int64)
    mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    n, dim = mat.shape
    nm = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)

    qsel = np.argsort(ids)[:nq]
    qids, qn = ids[qsel], nm[qsel]

    # brute-force truth
    sims = qn @ nm.T
    truth = []
    for i, q in enumerate(qids):
        s = sims[i].copy()
        s[ids == q] = -np.inf
        truth.append(set(ids[np.lexsort((ids, -s))[:k]].tolist()))

    print(f"sf={sf_dir} n={n} dim={dim} queries={nq} k={k}")
    print(f"{'planes':>6} {'probe_h':>7} {'recall@10':>9} {'scan_frac':>9} "
          f"{'part_frac':>9}")
    for planes in (4, 6, 8):
        lsh = RandomHyperplaneLSH(dim, planes)
        vb = lsh.bucket(nm)
        qb = lsh.bucket(qn)
        bincount = np.bincount(vb, minlength=1 << planes)
        for h in (0, 1, 2):
            recalls, scan, parts = [], [], []
            for i, q in enumerate(qids):
                pbs = hamming_probes(int(qb[i]), planes, h)
                cand_mask = np.isin(vb, pbs)
                cand = ids[cand_mask]
                s = sims[i][cand_mask]
                keep = cand != q
                cand, s = cand[keep], s[keep]
                got = set(cand[np.lexsort((cand, -s))[:k]].tolist())
                recalls.append(len(got & truth[i]) / k)
                scan.append(cand_mask.sum() / n)
                parts.append(
                    sum(1 for b in set(pbs) if bincount[b] > 0)
                    / (1 << planes)
                )
            print(
                f"{planes:>6} {h:>7} {np.mean(recalls):>9.3f} "
                f"{np.mean(scan):>9.3f} {np.mean(parts):>9.3f}"
            )


if __name__ == "__main__":
    main()
