"""Round-3 training-data operators: near-dup connected-components clusters,
PII redaction, token-rarity scoring."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

@pytest.fixture
def _ray(ray_session):
    yield


def _pairs_ds(pairs):
    import ray.data

    a, b = zip(*pairs) if pairs else ((), ())
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_a": pa.array(list(a), pa.int64()),
                "doc_b": pa.array(list(b), pa.int64()),
            }
        )
    )


def _clusters(pairs):
    from exactextractr_ray.stages.dedup import dup_clusters

    df = dup_clusters(_pairs_ds(pairs)).to_pandas()
    return dict(zip(df["doc_id"].astype(int), df["cluster_id"].astype(int)))


def test_dup_clusters_chain_star_singleton(_ray):
    got = _clusters([(1, 2), (2, 3), (7, 9), (20, 21), (30, 31), (30, 32)])
    assert got == {
        1: 1, 2: 1, 3: 1,          # chain collapses transitively
        7: 7, 9: 7,
        20: 20, 21: 20,
        30: 30, 31: 30, 32: 30,    # star keeps its hub as keeper
    }


def test_dup_clusters_long_chain_converges(_ray):
    # a 64-node path graph needs multiple hash-to-min rounds
    n = 64
    got = _clusters([(100 + i, 101 + i) for i in range(n - 1)])
    assert len(got) == n
    assert set(got.values()) == {100}


def test_dup_clusters_order_invariant(_ray):
    # reversed pair orientation and shuffled order give identical clusters
    base = [(5, 9), (9, 2), (40, 41), (2, 33)]
    flipped = [(b, a) for a, b in reversed(base)]
    assert _clusters(base) == _clusters(flipped)
    assert _clusters(base)[33] == 2
    assert _clusters(base)[40] == 40


def test_dup_clusters_empty(_ray):
    from exactextractr_ray.stages.dedup import dup_clusters

    df = dup_clusters(_pairs_ds([])).to_pandas()
    assert len(df) == 0


def test_pii_redact_patterns():
    from exactextractr_ray.stages.text import pii_redact_batch

    batch = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(
                [
                    "mail me at a.b+c@sub.example.org today",
                    "call 555-123-4567 or 555 987 6543 now",
                    "server 192.168.0.1 and 10.0.0.255 down",
                    "clean text with no pii at all",
                ]
            ),
        }
    )
    out = pii_redact_batch(batch).to_pandas()
    assert out["n_email"].tolist() == [1, 0, 0, 0]
    assert out["n_phone"].tolist() == [0, 2, 0, 0]
    assert out["n_ip"].tolist() == [0, 0, 2, 0]
    assert out["clean_text"][0] == "mail me at <EMAIL> today"
    assert out["clean_text"][1] == "call <PHONE> or <PHONE> now"
    assert out["clean_text"][2] == "server <IP> and <IP> down"
    assert out["clean_text"][3] == "clean text with no pii at all"
    assert out["n_email"].dtype == np.int64


def test_pii_redact_order_email_before_ip():
    # the domain of an already-redacted email must not re-match as an IP
    from exactextractr_ray.stages.text import pii_redact_batch

    batch = pa.table(
        {
            "doc_id": pa.array([1], pa.int64()),
            "text": pa.array(["root@10.0.0.1 logged in from 10.0.0.2"]),
        }
    )
    out = pii_redact_batch(batch).to_pandas()
    # 'root@10.0.0.1' fails the email TLD rule (needs alpha TLD), so both
    # dotted quads are IPs — the fixed pattern order keeps this stable
    assert out["n_ip"][0] == 2
    assert out["clean_text"][0] == "root@<IP> logged in from <IP>"


def test_token_rarity_small(_ray):
    import ray.data

    from exactextractr_ray.stages.text import token_rarity

    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                # corpus counts: the=3, cat=2, sat=1, zz=1
                "text": pa.array(["the cat sat", "the cat", "the zz"]),
            }
        )
    )
    df = (
        token_rarity(docs)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert df["n_tokens"].tolist() == [3, 2, 2]
    assert df["freq_sum"].tolist() == [6, 5, 4]
    np.testing.assert_allclose(
        df["mean_tok_freq"].to_numpy(), [2.0, 2.5, 2.0]
    )


def test_token_rarity_empty_doc_and_cap(_ray):
    import ray.data

    from exactextractr_ray.stages.text import token_rarity

    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": pa.array(["a a a b", ""]),
            }
        )
    )
    df = (
        token_rarity(docs)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert df["n_tokens"].tolist() == [4, 0]
    assert pd.isna(df["mean_tok_freq"][1])
    # max_vocab=1 keeps only 'a' (count 3); 'b' probes at the floor of 1
    df2 = (
        token_rarity(docs, max_vocab=1)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert df2["freq_sum"].tolist() == [10, 0]


def test_queries_registered():
    import __ray_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    for name in ("dup_clusters", "pii_redact", "token_rarity"):
        assert name in q and name in o


def test_curate_corpus_composition(_ray):
    """End-to-end: non-English and repetitive docs drop, exact dups keep
    min-id, transitive near-dups keep one representative."""
    import ray.data

    from exactextractr_ray.pipelines.curate import curate_corpus

    en = "the cat and the dog sat on to in is that it for on a mat"
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
                "text": pa.array(
                    [
                        en + " one",
                        en + " one",          # exact dup of 1 -> dropped
                        en + " two",          # near-dup of 1 -> clustered
                        "der die das und ist nicht ein mit zu den",  # de
                        "spam spam spam spam spam spam",  # repetition gate
                        "the sun is bright and the moon is dim for it sat"
                        " high in that sky tonight okay",
                    ]
                ),
            }
        )
    )
    df = (
        curate_corpus(docs, jaccard_threshold=0.5)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    kept = set(df["doc_id"].astype(int))
    assert 2 not in kept            # exact dup loses to doc 1
    assert 4 not in kept            # language gate
    assert 5 not in kept            # repetition gate
    assert 1 in kept and 6 in kept
    assert 3 not in kept            # near-dup cluster keeps only doc 1
    assert list(df.columns) == [
        "doc_id", "pred_lang", "n_words", "quality_score",
    ]
