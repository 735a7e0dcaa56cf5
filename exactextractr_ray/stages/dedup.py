"""Deduplication operators for the document pipeline: exact, MinHash+LSH,
SimHash, n-gram Jaccard.

Scale shapes (the 100 TB design point):

* exact: hash the content INSIDE map_batches (cheap, vectorizable), then
  ``groupby(content_hash)`` — the shuffle moves (hash, doc_id) pairs, never
  document bodies;
* MinHash/LSH: signature computation is embarrassingly parallel; candidate
  generation is a ``flat_map`` to (band, bucket) keys + ``groupby`` — only
  signatures shuffle; true-Jaccard verification happens inside the bucket
  group using the shingle-hash sets carried as list columns;
* SimHash: 64-bit signatures, banded into 4x16-bit chunks for the same
  bucket-groupby shape.

All hashes are explicit polynomial/md5 hashes — never Python ``hash()`` —
so results are bit-stable across processes and parallelism levels.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

_P61 = (1 << 61) - 1


def _md5_u64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:16], 16)


def content_hash_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    texts = batch.column(text_col).to_pylist()
    hs = [hashlib.md5((t or "").encode()).hexdigest() for t in texts]
    return batch.append_column("content_hash", pa.array(hs, type=pa.string()))


def exact_dedup(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Exact dedup: one keeper (min id) per distinct content.

    Returns a Dataset of (content_hash, keeper_id, n_dups). The shuffle key is
    the md5 hash; document text never moves.
    """
    hashed = ds.map_batches(
        lambda b: content_hash_batch(b, text_col).select(["content_hash", id_col]),
        batch_format="pyarrow",
    )

    def pick_keeper(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "content_hash": [g["content_hash"].iloc[0]],
                "keeper_id": [int(g[id_col].min())],
                "n_dups": [len(g)],
            }
        )

    return hashed.groupby("content_hash").map_groups(pick_keeper, batch_format="pandas")


# ---------------- MinHash + LSH ----------------


class MinHasher:
    """Per-actor state: the H hash-function parameters (built once)."""

    def __init__(
        self,
        num_hashes: int = 64,
        shingle_k: int = 3,
        id_col: str = "doc_id",
        text_col: str = "text",
    ):
        self.k = shingle_k
        self.H = num_hashes
        self.id_col = id_col
        self.text_col = text_col
        rng = np.random.default_rng(42)  # fixed seed: signatures reproducible
        self.a = rng.integers(1, _P61, size=num_hashes, dtype=np.uint64)
        self.b = rng.integers(0, _P61, size=num_hashes, dtype=np.uint64)

    def shingle_hashes(self, text: str) -> np.ndarray:
        toks = (text or "").split(" ")
        if len(toks) < self.k:
            grams = [" ".join(toks)]
        else:
            grams = [
                " ".join(toks[j : j + self.k]) for j in range(len(toks) - self.k + 1)
            ]
        return np.unique(
            np.array([_md5_u64(g) for g in grams], dtype=np.uint64) % _P61
        )

    def signature(self, sh: np.ndarray) -> np.ndarray:
        if len(sh) == 0:
            return np.zeros(self.H, dtype=np.uint64)
        # (a*x + b) mod p, min over shingles, vectorized H x S
        prod = (self.a[:, None] * sh[None, :] + self.b[:, None]) % _P61
        return prod.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_numpy()
        texts = batch.column(self.text_col).to_pylist()
        sigs, shingles = [], []
        for t in texts:
            sh = self.shingle_hashes(t)
            shingles.append(sh)
            sigs.append(self.signature(sh))
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "minhash": pa.array([s.tolist() for s in sigs], pa.list_(pa.uint64())),
                "shingles": pa.array(
                    [s.tolist() for s in shingles], pa.list_(pa.uint64())
                ),
            }
        )


def _band_batch(batch: pa.Table, bands: int, rows: int) -> pa.Table:
    """signatures -> (band, bucket, doc_id, shingles) rows (flat_map shape)."""
    ids = batch.column("doc_id").to_numpy()
    sigs = batch.column("minhash").to_pylist()
    shingles = batch.column("shingles")
    out_band, out_bucket, out_id, out_idx = [], [], [], []
    for i, sig in enumerate(sigs):
        for b in range(bands):
            chunk = tuple(sig[b * rows : (b + 1) * rows])
            bucket = _md5_u64(f"{b}:{chunk}")
            out_band.append(b)
            out_bucket.append(bucket)
            out_id.append(int(ids[i]))
            out_idx.append(i)
    tbl = pa.table(
        {
            "band": pa.array(out_band, pa.int32()),
            "bucket": pa.array(out_bucket, pa.uint64()),
            "doc_id": pa.array(out_id, pa.int64()),
            "shingles": shingles.take(pa.array(out_idx, pa.int32())),
        }
    )
    return tbl


def _bucket_pairs(g: pd.DataFrame, threshold: float) -> pd.DataFrame:
    """Within one LSH bucket: verify candidate pairs with true Jaccard."""
    if len(g) < 2:
        return pd.DataFrame({"doc_a": [], "doc_b": [], "jaccard": []})
    g = g.sort_values("doc_id")
    ids = g["doc_id"].to_numpy()
    sets = [np.asarray(s, dtype=np.uint64) for s in g["shingles"]]
    out_a, out_b, out_j = [], [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            inter = len(np.intersect1d(sets[i], sets[j], assume_unique=True))
            union = len(sets[i]) + len(sets[j]) - inter
            jac = inter / union if union else 0.0
            if jac >= threshold:
                out_a.append(int(ids[i]))
                out_b.append(int(ids[j]))
                out_j.append(jac)
    return pd.DataFrame({"doc_a": out_a, "doc_b": out_b, "jaccard": out_j})


def minhash_lsh_pairs(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    threshold: float = 0.5,
):
    """Near-duplicate pairs via MinHash banding + true-Jaccard verification.

    Returns a Dataset of (doc_a, doc_b, jaccard), doc_a < doc_b, deduplicated
    across bands. Shuffle volume: bands x (few hundred bytes) per doc.
    """
    rows = num_hashes // bands
    sigs = ds.map_batches(
        MinHasher,
        fn_constructor_args=(num_hashes, shingle_k, id_col, text_col),
        batch_format="pyarrow",
        concurrency=(1, 8),
    )
    banded = sigs.map_batches(
        lambda b: _band_batch(b, bands, rows), batch_format="pyarrow"
    )
    pairs = banded.groupby("bucket").map_groups(
        lambda g: _bucket_pairs(g, threshold), batch_format="pandas"
    )

    # a pair can surface from several bands -> distinct
    def dedup_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)

    return pairs.groupby(["doc_a", "doc_b"]).map_groups(
        dedup_pairs, batch_format="pandas"
    )


# ---------------- SimHash ----------------


def simhash_batch(batch: pa.Table, id_col="doc_id", text_col="text") -> pa.Table:
    ids = batch.column(id_col).to_numpy()
    texts = batch.column(text_col).to_pylist()
    out = np.empty(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts):
        toks = (t or "").split(" ")
        acc = np.zeros(64, dtype=np.int64)
        for tok in toks:
            h = _md5_u64(tok)
            bits = (h >> np.arange(64, dtype=np.uint64)) & 1
            acc += np.where(bits.astype(bool), 1, -1)
        bits = (acc > 0).astype(np.uint64)
        out[i] = np.bitwise_or.reduce(bits << np.arange(64, dtype=np.uint64))
    return pa.table(
        {"doc_id": pa.array(ids, pa.int64()), "simhash": pa.array(out, pa.uint64())}
    )


def simhash_pairs(ds, max_hamming: int = 3, id_col="doc_id", text_col="text"):
    """Near-dup pairs by SimHash: band the 64-bit signature into 4 x 16-bit
    chunks (any pair within hamming<=3 shares at least one exact chunk),
    groupby chunk, verify hamming distance within the group."""
    sigs = ds.map_batches(
        lambda b: simhash_batch(b, id_col, text_col), batch_format="pyarrow"
    )

    def band(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy()
        sh = b.column("simhash").to_numpy()
        out_k, out_id, out_sig = [], [], []
        for part in range(4):
            chunk = (sh >> np.uint64(16 * part)) & np.uint64(0xFFFF)
            for i in range(len(ids)):
                out_k.append(int(part) << 16 | int(chunk[i]))
                out_id.append(int(ids[i]))
                out_sig.append(int(sh[i]))
        return pa.table(
            {
                "bkey": pa.array(out_k, pa.int64()),
                "doc_id": pa.array(out_id, pa.int64()),
                "simhash": pa.array(out_sig, pa.uint64()),
            }
        )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": [], "hamming": []})
        g = g.sort_values("doc_id")
        ids = g["doc_id"].to_numpy()
        sh = g["simhash"].to_numpy().astype(np.uint64)
        out_a, out_b, out_h = [], [], []
        for i in range(len(ids)):
            x = sh[i] ^ sh[i + 1 :]
            hd = np.array([bin(v).count("1") for v in x.tolist()])
            for j in np.nonzero(hd <= max_hamming)[0]:
                out_a.append(int(ids[i]))
                out_b.append(int(ids[i + 1 + j]))
                out_h.append(int(hd[j]))
        return pd.DataFrame({"doc_a": out_a, "doc_b": out_b, "hamming": out_h})

    banded = sigs.map_batches(band, batch_format="pyarrow")
    cand = banded.groupby("bkey").map_groups(pairs, batch_format="pandas")
    return cand.groupby(["doc_a", "doc_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )
