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
        # dtype-strict: the driver's value hash is dtype-sensitive, so an
        # int64-vs-float64 mismatch fails there even when values are equal.
        # Only object columns (strings/lists) are exempt from kind matching.
        if av.dtype.kind != bv.dtype.kind and "O" not in (
            av.dtype.kind,
            bv.dtype.kind,
        ):
            issues.append(
                f"{c}: DTYPE MISMATCH ray={av.dtype} ora={bv.dtype} "
                "(driver hash is dtype-sensitive)"
            )
            continue
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


# ---------------------------------------------------------------------------
# deterministic non-SQL ground-truth checks for the approximate operators
# (driver records these queries rows-only; the pass criteria live here)
# ---------------------------------------------------------------------------


def check_minhash_bruteforce(ray_df: pd.DataFrame, sf_dir: str) -> str:
    """Ground truth: EXACT Jaccard over the same 3-gram shingle hashes for
    all pairs of docs with doc_id < 1000 (inverted-index pair counting).
    Pass criteria: (a) zero false positives — every reported pair is a true
    >= threshold pair; (b) reported jaccard values bit-equal to the exact
    computation; (c) recall >= 0.9 on the subset (banding is probabilistic;
    measured recall is reported)."""
    from collections import defaultdict
    from itertools import combinations

    import pyarrow.parquet as pq

    from exactextractr_ray.stages.dedup import MinHasher

    threshold = 0.35  # must match _q_minhash
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    df = t.to_pandas()
    df = df[df.doc_id < 1000]
    h = MinHasher()
    sets = {int(r.doc_id): h.shingle_hashes(r.text) for r in df.itertuples()}
    inv = defaultdict(list)
    for d, sh in sets.items():
        for s in sh.tolist():
            inv[s].append(d)
    cnt: dict[tuple[int, int], int] = defaultdict(int)
    for ds_ in inv.values():
        if len(ds_) > 1:
            for a, b in combinations(sorted(ds_), 2):
                cnt[(a, b)] += 1
    truth = {}
    for (a, b), inter in cnt.items():
        union = len(sets[a]) + len(sets[b]) - inter
        j = inter / union if union else 0.0
        if j >= threshold:
            truth[(a, b)] = j
    got = {
        (int(r.doc_a), int(r.doc_b)): float(r.jaccard)
        for r in ray_df.itertuples()
        if int(r.doc_a) < 1000 and int(r.doc_b) < 1000
    }
    false_pos = sorted(set(got) - set(truth))
    bit_diff = [k for k in got if k in truth and got[k] != truth[k]]
    recall = len([k for k in truth if k in got]) / len(truth) if truth else 1.0
    if false_pos:
        return f"FALSE POSITIVES: {false_pos[:5]}"
    if bit_diff:
        return f"JACCARD NOT BIT-EXACT: {bit_diff[:5]}"
    if recall < 0.9:
        return f"RECALL {recall:.3f} < 0.9 ({len(truth)} true pairs)"
    return f"OK (0 false pos, jaccard bit-exact, recall {recall:.3f} of {len(truth)})"


def check_knn_lsh_exact(ray_df: pd.DataFrame, sf_dir: str) -> str:
    """The LSH kNN is deterministic (fixed-seed hyperplanes), so its exact
    expected output is re-derivable in-process: bucket every vector with the
    same planes, scan each query's bucket, rank by (-sim, neighbor_id).
    Pass criterion: the pipeline output is IDENTICAL to this re-derivation;
    brute-force recall@k is reported for context."""
    import pyarrow.parquet as pq

    from exactextractr_ray.stages.knn import RandomHyperplaneLSH, hamming_probes

    KNN_Q, KNN_K, NUM_PLANES, PROBE_H = 8, 10, 4, 1  # must match _q_knn_lsh
    emb = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pandas()
    ids = emb["vec_id"].to_numpy().astype(np.int64)
    mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    qsel = ids < KNN_Q
    qids, qmat = ids[qsel], mat[qsel]
    lsh = RandomHyperplaneLSH(mat.shape[1], NUM_PLANES)
    vb = lsh.bucket(mat)
    qb = lsh.bucket(qmat)
    nm = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    qn = qmat / np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-12)
    rows = []
    recalls = []
    full_sims = qn @ nm.T
    for qi, (q, b) in enumerate(zip(qids, qb)):
        # multi-probe: SAME probe enumeration as the pipeline (shared fn)
        pbs = hamming_probes(int(b), NUM_PLANES, PROBE_H)
        cand = np.nonzero(np.isin(vb, pbs))[0]
        cand = cand[ids[cand] != q]
        sims = nm[cand] @ qn[qi]
        order = np.lexsort((ids[cand], -sims))[:KNN_K]
        got_n = ids[cand][order]
        for r, (nid, s) in enumerate(zip(got_n, sims[order]), 1):
            rows.append((int(q), int(nid), r))
        # brute-force truth for recall context
        fs = full_sims[qi].copy()
        fs[ids == q] = -np.inf
        true_top = ids[np.lexsort((ids, -fs))[:KNN_K]]
        recalls.append(len(set(got_n) & set(true_top)) / KNN_K)
    exp = pd.DataFrame(rows, columns=["query_id", "neighbor_id", "rank"]).sort_values(
        ["query_id", "rank"]
    ).reset_index(drop=True)
    got = ray_df[["query_id", "neighbor_id", "rank"]].sort_values(
        ["query_id", "rank"]
    ).reset_index(drop=True)
    if not exp.equals(got.astype(exp.dtypes.to_dict())):
        return f"MISMATCH vs deterministic re-derivation ({len(exp)} vs {len(got)} rows)"
    return f"OK (exact match to re-derivation; brute recall@{KNN_K} {np.mean(recalls):.2f})"


def _wc_from_documents(sf_dir: str) -> dict:
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"])
    wc: dict = {}
    for txt in t.column("text").to_pylist():
        for w in (txt or "").split():
            wc[w] = wc.get(w, 0) + 1
    return wc


def check_unigram_reference(ray_df: pd.DataFrame, sf_dir: str) -> str:
    """Distributed Unigram-LM trainer vs the single-process reference:
    hard-EM integer counts make the run parallelism-invariant, so the
    tables must be IDENTICAL (piece, cnt, logp — float logp included,
    since both sides compute log(cnt)-log(total) from the same ints)."""
    from exactextractr_ray.stages.unigram import unigram_train_reference

    exp = unigram_train_reference(
        _wc_from_documents(sf_dir), vocab_size=64, seed_size=512
    )
    got = ray_df.reset_index(drop=True)
    if not got.equals(exp):
        return f"UNIGRAM MISMATCH vs reference ({len(got)} vs {len(exp)})"
    return f"OK (bit-exact vs single-process reference, {len(exp)} pieces)"


def check_unigram_encode_reference(ray_df: pd.DataFrame, sf_dir: str) -> str:
    import pyarrow.parquet as pq

    from exactextractr_ray.stages.unigram import (
        UNK,
        _viterbi_segment,
        unigram_train_reference,
    )

    vocab = unigram_train_reference(
        _wc_from_documents(sf_dir), vocab_size=64, seed_size=512
    )
    logp = dict(zip(vocab["piece"], vocab["logp"]))
    t = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text"]).to_pandas()
    rows = []
    for r in t.itertuples():
        toks: list = []
        unk = 0
        for w in (r.text or "").split():
            seg = _viterbi_segment(w, logp, 8)
            if seg is None:
                toks.append(UNK)
                unk += 1
            else:
                toks.extend(seg)
        rows.append((int(r.doc_id), len(toks), unk, " ".join(toks)))
    exp = pd.DataFrame(
        rows, columns=["doc_id", "n_tokens", "n_unk", "tokens_concat"]
    ).sort_values("doc_id").reset_index(drop=True)
    got = ray_df.sort_values("doc_id").reset_index(drop=True)
    if not got.astype(exp.dtypes.to_dict()).equals(exp):
        return "UNIGRAM ENCODE MISMATCH vs reference"
    return f"OK (bit-exact vs reference encode, {len(exp)} docs)"


def check_knn_pq_exact(ray_df: pd.DataFrame, sf_dir: str) -> str:
    """The PQ kNN is deterministic (seeded codebooks, fixed iteration
    count, tie-broken sorts), so its exact expected output re-derives
    in-process: train the same codebooks with the pipeline's own
    train_pq, encode by argmin, ADC-score with the same lut accumulation
    order, keep refine*k by (-adc, neighbor_id), exact-cosine re-rank.
    Pass criterion: IDENTICAL (query_id, neighbor_id, rank) rows;
    brute-force recall@k is reported for context."""
    import pyarrow.parquet as pq

    import ray as _ray

    from exactextractr_ray.stages.knn import train_pq

    KNN_Q, KNN_K, M, KS, REFINE = 8, 10, 16, 64, 4  # must match _q_knn_pq
    emb = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pandas()
    ids = emb["vec_id"].to_numpy().astype(np.int64)
    mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    qsel = ids < KNN_Q
    qids, qmat = ids[qsel], mat[qsel]
    ds = _ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    books = train_pq(ds, m=M, ks=KS)
    m, ks, dsub = books.shape
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    nm = mat / norms
    codes = np.empty((nm.shape[0], m), np.int64)
    for i in range(m):
        X = nm[:, i * dsub:(i + 1) * dsub]
        C = books[i]
        d2 = (X * X).sum(1)[:, None] - 2.0 * X @ C.T + (C * C).sum(1)[None]
        codes[:, i] = d2.argmin(axis=1)
    qnorm = np.linalg.norm(qmat, axis=1, keepdims=True)
    qnorm[qnorm == 0] = 1.0
    qn = qmat / qnorm
    lut = np.einsum("qid,ikd->qik", qn.reshape(len(qids), m, dsub), books)
    scores = np.zeros((len(qids), nm.shape[0]), np.float64)
    for i in range(m):
        scores += lut[:, i, codes[:, i]]
    nkeep = REFINE * (KNN_K + 1)
    rows = []
    recalls = []
    full = qn @ nm.T
    for qi, q in enumerate(qids):
        keep = np.lexsort((ids, -scores[qi]))[:nkeep]
        sims = nm[keep] @ qn[qi]
        sel = ids[keep] != q
        order = np.lexsort((ids[keep][sel], -sims[sel]))[:KNN_K]
        nbrs = ids[keep][sel][order]
        for r, nb in enumerate(nbrs, 1):
            rows.append((int(q), int(nb), r))
        bsel = ids != q
        border = np.lexsort((ids[bsel], -full[qi][bsel]))[:KNN_K]
        truth = set(ids[bsel][border].tolist())
        recalls.append(len(truth & set(nbrs.tolist())) / KNN_K)
    exp = pd.DataFrame(rows, columns=["query_id", "neighbor_id", "rank"])
    got = ray_df[["query_id", "neighbor_id", "rank"]].reset_index(drop=True)
    exp = exp.sort_values(["query_id", "rank"]).reset_index(drop=True)
    got = got.sort_values(["query_id", "rank"]).reset_index(drop=True)
    if not got.astype("int64").equals(exp.astype("int64")):
        return "PQ MISMATCH vs exact re-derivation"
    return f"OK (exact re-derivation; recall@{KNN_K} {np.mean(recalls):.2f})"


def check_bpe_reference(ray_df, sf_dir):
    """bpe_train_merges: bit-exact vs the single-process Sennrich
    reference run on the same corpus (iterative argmax isn't SQL)."""
    import duckdb

    from exactextractr_ray.stages.bpe import bpe_train_reference

    texts = (
        duckdb.connect()
        .execute(
            f"SELECT text FROM read_parquet('{sf_dir}/documents.parquet')"
        )
        .df()["text"]
        .tolist()
    )
    want = bpe_train_reference(texts, num_merges=12)
    got = ray_df[want.columns.tolist()].reset_index(drop=True)
    if got.equals(want.reset_index(drop=True)):
        return "OK (bit-exact vs single-process Sennrich reference)"
    return "MISMATCH vs BPE reference implementation"


def check_bpe_encode_reference(ray_df, sf_dir):
    """bpe_encode_tokens: train 12 merges with the single-process
    reference, encode every doc with the same greedy-rank loop, compare."""
    import duckdb

    from exactextractr_ray.stages.bpe import (
        bpe_encode_batch,
        bpe_train_reference,
    )
    import pyarrow as pa

    df = (
        duckdb.connect()
        .execute(
            f"SELECT doc_id, text FROM "
            f"read_parquet('{sf_dir}/documents.parquet') ORDER BY doc_id"
        )
        .df()
    )
    ref = bpe_train_reference(df["text"].tolist(), num_merges=12)
    merges = list(zip(ref["left"], ref["right"]))
    want = bpe_encode_batch(
        pa.Table.from_pandas(df, preserve_index=False), merges
    ).to_pandas()
    got = (
        ray_df[want.columns.tolist()]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    if got.equals(want.sort_values("doc_id").reset_index(drop=True)):
        return "OK (bit-exact vs reference train+encode)"
    return "MISMATCH vs BPE reference encode"


def check_strahler_reference(ray_df, sf_dir):
    """strahler_order: bit-exact vs a single-process whole-array
    rederivation (synth values -> Horn D8 on the padded array -> python
    dict-based topological Strahler) — an independent code path from the
    distributed per-basin fold."""
    import numpy as np

    from exactextractr_ray import synth
    from exactextractr_ray.pipelines.focal import _D8

    n = 64
    r, c = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    vals = synth.synth_values(r, c)
    pad = np.full((n + 2, n + 2), np.nan)
    pad[1:-1, 1:-1] = vals
    succ: dict[int, int] = {}
    children: dict[int, list] = {}
    nodes = []
    for i in range(n):
        for j in range(n):
            if np.isnan(vals[i, j]):
                continue
            nodes.append(i * n + j)
            win = pad[i : i + 3, j : j + 3]
            if np.isnan(win).any():
                continue
            center = win[1, 1]
            best_key, best = 0.0, None
            for code, dr, dc in _D8:
                drop = center - win[1 + dr, 1 + dc]
                key = (2.0 if (dr == 0 or dc == 0) else 1.0) * drop * drop
                if drop > 0 and key > best_key:
                    best_key, best = key, (dr, dc)
            if best is not None:
                succ[i * n + j] = (i + best[0]) * n + (j + best[1])
    for u, v in succ.items():
        children.setdefault(v, []).append(u)
    order: dict[int, int] = {}

    def strahler(v):
        if v in order:
            return order[v]
        ch = [strahler(u) for u in children.get(v, [])]
        if not ch:
            o = 1
        else:
            m = max(ch)
            o = m + 1 if ch.count(m) >= 2 else m
        order[v] = o
        return o

    import sys as _sys

    _sys.setrecursionlimit(100_000)
    want = {v: strahler(v) for v in nodes}
    got = dict(
        zip(ray_df["cell"].astype(int), ray_df["strahler"].astype(int))
    )
    if got == want:
        return "OK (bit-exact vs single-process recursive rederivation)"
    bad = [k for k in want if got.get(k) != want[k]][:5]
    return f"MISMATCH vs Strahler reference ({len(bad)}+ cells, e.g. {bad})"


def check_simplify_reference(ray_df, sf_dir):
    """simplify_lines: bit-exact vs an independent RECURSIVE
    Douglas-Peucker over the same generated polylines (the pipeline uses
    an explicit stack; this reference uses true recursion and fraction
    comparison cross^2/len2 > tol^2 via exact integer cross-multiply)."""

    tol2 = 40 * 40
    want = {}
    for k in range(48):
        m = 12 + k % 9
        xs = [j * 64 for j in range(m)]
        ys = [(k * 31 + j * j * 17) % 512 for j in range(m)]

        def rec(lo, hi, keep):
            if hi - lo < 2:
                return
            ax, ay, bx, by = xs[lo], ys[lo], xs[hi], ys[hi]
            dx, dy = bx - ax, by - ay
            len2 = dx * dx + dy * dy
            best, bk = -1, 0
            for j in range(lo + 1, hi):
                px, py = xs[j] - ax, ys[j] - ay
                if len2 == 0:
                    key, bound = (px * px + py * py) * tol2, tol2 * tol2
                else:
                    cr = dx * py - dy * px
                    key, bound = cr * cr, tol2 * len2
                if key > bound and key > bk:
                    best, bk = j, key
            if best >= 0:
                keep.add(best)
                rec(lo, best, keep)
                rec(best, hi, keep)

        keep = {0, m - 1}
        rec(0, m - 1, keep)
        seq = 0
        for j in sorted(keep):
            want[(k, seq)] = (xs[j], ys[j])
            seq += 1
    got = {
        (int(r.line_id), int(r.seq)): (int(r.x), int(r.y))
        for r in ray_df.itertuples()
    }
    if got == want:
        return "OK (bit-exact vs independent recursive Douglas-Peucker)"
    bad = [k for k in want if got.get(k) != want[k]][:5]
    return f"MISMATCH vs DP reference (e.g. {bad}; rows {len(got)} vs {len(want)})"


def check_wordpiece_reference(ray_df, sf_dir):
    """wordpiece_train_merges: bit-exact vs the single-process
    likelihood-scored reference."""
    import duckdb

    from exactextractr_ray.stages.wordpiece import wordpiece_train_reference

    texts = (
        duckdb.connect()
        .execute(
            f"SELECT text FROM read_parquet('{sf_dir}/documents.parquet')"
        )
        .df()["text"]
        .tolist()
    )
    want = wordpiece_train_reference(texts, num_merges=10)
    got = ray_df[want.columns.tolist()].reset_index(drop=True)
    if got.equals(want.reset_index(drop=True)):
        return "OK (bit-exact vs single-process WordPiece reference)"
    return "MISMATCH vs WordPiece reference implementation"


def check_wordpiece_encode_reference(ray_df, sf_dir):
    """wordpiece_encode_tokens: reference-train 10 merges, reference
    greedy-encode every doc, compare counts."""
    import duckdb

    from exactextractr_ray.stages.wordpiece import (
        wordpiece_encode_word,
        wordpiece_train_reference,
        wordpiece_vocab,
    )

    df = (
        duckdb.connect()
        .execute(
            "SELECT doc_id, text FROM "
            f"read_parquet('{sf_dir}/documents.parquet') ORDER BY doc_id"
        )
        .df()
    )
    texts = df["text"].tolist()
    merges = wordpiece_train_reference(texts, num_merges=10)
    vocab = wordpiece_vocab(
        merges, (w for t in texts for w in (t or "").split())
    )
    want = {}
    for did, t in zip(df["doc_id"], texts):
        nt = nu = 0
        for w in (t or "").split():
            pieces = wordpiece_encode_word(w, vocab)
            nt += len(pieces)
            nu += sum(1 for p in pieces if p == "[UNK]")
        want[int(did)] = (nt, nu)
    got = {
        int(r.doc_id): (int(r.wp_tokens), int(r.wp_unks))
        for r in ray_df.itertuples()
    }
    if got == want:
        return "OK (bit-exact vs reference WordPiece encode)"
    bad = [k for k in want if got.get(k) != want[k]][:5]
    return f"MISMATCH vs WordPiece encode reference (e.g. {bad})"


def check_cost_distance_reference(ray_df, sf_dir):
    """cost_distance: bit-exact vs single-process Dijkstra on the same
    synthetic cost raster."""
    import numpy as np
    import pandas as pd

    from exactextractr_ray import synth
    from exactextractr_ray.pipelines.costdistance import (
        INF,
        cost_distance_reference,
    )

    n = 64
    rr, cc = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    cost = synth.synth_values(rr, cc).astype(np.float64)
    want = cost_distance_reference(cost, [(0, 0), (50, 57)])
    wr, wc = np.nonzero(want < INF)
    wdf = (
        pd.DataFrame({"row": wr, "col": wc, "dist": want[wr, wc]})
        .sort_values(["row", "col"])
        .reset_index(drop=True)
    )
    got = ray_df.reset_index(drop=True)
    if got.equals(wdf):
        return "OK (bit-exact vs single-process Dijkstra)"
    return (
        f"MISMATCH vs Dijkstra reference ({len(got)} vs {len(wdf)} rows)"
    )


def check_least_cost_path_reference(ray_df, sf_dir):
    """least_cost_path: bit-exact vs full-raster Dijkstra + back-trace."""
    import numpy as np
    import pandas as pd

    from exactextractr_ray import synth
    from exactextractr_ray.pipelines.costdistance import (
        cost_distance_reference,
        least_cost_path_reference,
    )

    n = 64
    rr, cc = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    cost = synth.synth_values(rr, cc).astype(np.float64)
    dist = cost_distance_reference(cost, [(0, 1)])
    want = least_cost_path_reference(cost, dist, (63, 60))
    wdf = pd.DataFrame(
        {
            "step": np.arange(len(want), dtype=np.int64),
            "row": np.array([p[0] for p in want], np.int64),
            "col": np.array([p[1] for p in want], np.int64),
        }
    )
    if ray_df.reset_index(drop=True).equals(wdf):
        return "OK (bit-exact vs single-process back-trace)"
    return f"MISMATCH vs path reference ({len(ray_df)} vs {len(wdf)})"


def check_sieve_reference(ray_df, sf_dir):
    """sieve_raster: cell-exact vs single-process BFS labeling + the
    shared merge plan."""
    import numpy as np

    from exactextractr_ray import synth
    from exactextractr_ray.pipelines.sieve import (
        runs_to_array,
        sieve_reference,
    )

    n = 64
    rr, cc = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    cost = synth.synth_values(rr, cc).astype(np.float64)
    want = sieve_reference(cost, 6)
    got = runs_to_array(ray_df, (n, n))
    if np.array_equal(np.isnan(got), np.isnan(want)) and np.array_equal(
        got[~np.isnan(got)], want[~np.isnan(want)]
    ):
        return "OK (cell-exact vs single-process BFS sieve)"
    bad = int((got[~np.isnan(want)] != want[~np.isnan(want)]).sum())
    return f"MISMATCH vs sieve reference ({bad} cells differ)"


def check_convex_overlay_reference(ray_df, sf_dir):
    """convex_overlay: every pair area re-derived by the independent
    exact algorithm (vertex enumeration, not clipping)."""
    from fractions import Fraction

    from exactextractr_ray.pipelines.overlay import (
        _poly_fixture,
        intersection_area_reference,
    )

    want = {}
    for i in range(14):
        for j in range(14):
            area = intersection_area_reference(
                _poly_fixture(i), _poly_fixture(1000 + j)
            )
            if area > 0:
                want[(i, j)] = area
    got = {
        (int(r.a_id), int(r.b_id)): Fraction(int(r.area_num),
                                             int(r.area_den))
        for r in ray_df.itertuples()
    }
    if got == want:
        return "OK (exact-rational match vs independent vertex-enum algorithm)"
    bad = [k for k in want if got.get(k) != want[k]][:5]
    return f"MISMATCH vs overlay reference (e.g. {bad})"


def check_polygon_buffer_reference(ray_df, sf_dir):
    """polygon_buffer: every Minkowski sum re-derived by the independent
    edge-merge construction (vs the pipeline's hull-of-vertex-sums)."""
    from fractions import Fraction

    from exactextractr_ray.pipelines.overlay import (
        _poly_fixture,
        minkowski_sum_reference,
        polygon_area2,
    )

    octagon = [(2, 1), (1, 2), (-1, 2), (-2, 1), (-2, -1), (-1, -2),
               (1, -2), (2, -1)]
    want = {}
    for pid in range(14):
        s_ = minkowski_sum_reference(_poly_fixture(pid), octagon)
        want[pid] = (len(s_), polygon_area2(s_) / 2)
    got = {
        int(r.a_id): (int(r.n_vertices),
                      Fraction(int(r.area_num), int(r.area_den)))
        for r in ray_df.itertuples()
    }
    if got == want:
        return "OK (exact match vs independent edge-merge Minkowski sum)"
    bad = [k for k in want if got.get(k) != want[k]][:5]
    return f"MISMATCH vs Minkowski reference (e.g. {bad})"


SPECIAL_CHECKS = {
    "minhash_pairs": check_minhash_bruteforce,
    "convex_overlay": check_convex_overlay_reference,
    "polygon_buffer": check_polygon_buffer_reference,
    "cost_distance": check_cost_distance_reference,
    "least_cost_path": check_least_cost_path_reference,
    "sieve_raster": check_sieve_reference,
    "wordpiece_train_merges": check_wordpiece_reference,
    "wordpiece_encode_tokens": check_wordpiece_encode_reference,
    "knn_cosine_lsh": check_knn_lsh_exact,
    "knn_cosine_pq": check_knn_pq_exact,
    "unigram_train_pieces": check_unigram_reference,
    "unigram_encode_tokens": check_unigram_encode_reference,
    "bpe_train_merges": check_bpe_reference,
    "bpe_encode_tokens": check_bpe_encode_reference,
    "strahler_order": check_strahler_reference,
    "simplify_lines": check_simplify_reference,
}


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
            special = SPECIAL_CHECKS.get(name)
            if special is not None:
                verdict = special(ray_df, sf_dir)
                if "OK" not in verdict:
                    failures += 1
                print(f"{name:26s} {verdict}  ({t1-t0:.1f}s, {len(ray_df)} rows)")
            else:
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
