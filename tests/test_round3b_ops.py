"""Round-3 second-wave training-data operators: corpus-level duplicate-span
removal, URL canonicalization/dedup, bigram-LM coherence, SemDeDup."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


@pytest.fixture
def _ray(ray_session):
    yield


def _docs_ds(rows):
    import ray.data

    ids, texts = zip(*rows) if rows else ((), ())
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(ids), pa.int64()),
                "text": pa.array(list(texts), pa.string()),
            }
        )
    )


def _span_dedup(rows, **kw):
    from exactextractr_ray.stages.dedup import dup_span_dedup

    df = dup_span_dedup(_docs_ds(rows), **kw).to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True)


def test_dup_spans_basic(_ray):
    # window=2: doc1 spans ("a b","c d"), doc2 spans ("a b","x y") ->
    # "a b" is in 2 docs -> dropped from BOTH
    df = _span_dedup([(1, "a b c d"), (2, "a b x y")], window=2)
    assert df["clean_text"].tolist() == ["c d", "x y"]
    assert df["n_spans"].tolist() == [2, 2]
    assert df["n_dropped"].tolist() == [1, 1]


def test_dup_spans_within_doc_repeat_not_dropped(_ray):
    # the SAME span twice in ONE doc: df counts distinct docs, so it stays
    df = _span_dedup([(1, "a b a b"), (2, "c d e f")], window=2)
    assert df["clean_text"].tolist() == ["a b a b", "c d e f"]
    assert df["n_dropped"].tolist() == [0, 0]


def test_dup_spans_all_dropped_and_tail(_ray):
    # doc3's single short span (tail window < window words) matches doc4's
    # tail -> both drop; doc3 becomes empty string
    df = _span_dedup([(3, "p q"), (4, "r s t u p q")], window=4)
    assert df.loc[df.doc_id == 3, "clean_text"].iloc[0] == ""
    assert df.loc[df.doc_id == 4, "clean_text"].iloc[0] == "r s t u"
    assert df["n_dropped"].tolist() == [1, 1]


def test_dup_spans_min_df_and_cap(_ray):
    rows = [(1, "a b c d"), (2, "a b c d"), (3, "a b z z")]
    # min_df=3: only "a b" (3 docs) crosses; "c d" (2 docs) survives
    df = _span_dedup(rows, window=2, min_df=3)
    assert df["clean_text"].tolist() == ["c d", "c d", "z z"]
    # max_spans=0 disables every drop (cap keeps zero spans)
    df2 = _span_dedup(rows, window=2, max_spans=0)
    assert df2["n_dropped"].tolist() == [0, 0, 0]


def test_dup_spans_parallelism_invariant(_ray):
    rows = [(i, f"w{i % 3} x{i % 3} common tail words here now")
            for i in range(40)]
    a = _span_dedup(rows, window=4)
    from exactextractr_ray.stages.dedup import dup_span_dedup

    b = (
        dup_span_dedup(_docs_ds(rows).repartition(13), window=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
