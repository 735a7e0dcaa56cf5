"""Encoding repair (stages/text.py fix_mojibake / fix_encoding_batch):
UTF-8-as-Latin-1 double encoding, the ftfy web-corpus class."""

import pyarrow as pa

from exactextractr_ray.stages.text import fix_encoding_batch, fix_mojibake


def test_single_and_double_mojibake():
    good = "café № 5 — naïve"
    once = good.encode("utf-8").decode("latin-1")
    twice = once.encode("utf-8").decode("latin-1")
    assert fix_mojibake(once) == good
    assert fix_mojibake(twice) == good  # two repair passes


def test_clean_text_untouched():
    for s in ["plain ascii", "already fine: café", "", "日本語テキスト"]:
        assert fix_mojibake(s) == s
    # U+2014 can't encode latin-1 -> untouched even beside mojibake bait
    assert fix_mojibake("Ã© — mixed") == "Ã© — mixed"


def test_invalid_utf8_runs_untouched():
    # latin-1 text whose bytes are NOT valid UTF-8 stays as-is
    assert fix_mojibake("résumé à côté") == "résumé à côté"


def test_batch_stage_flags_and_ascii_shortcut():
    good = "touché"
    broken = good.encode("utf-8").decode("latin-1")
    b = pa.table(
        {"doc_id": pa.array([0, 1, 2], pa.int64()),
         "text": pa.array([broken, "plain", ""], pa.string())}
    )
    out = fix_encoding_batch(b)
    assert out.column("fixed_text").to_pylist() == [good, "plain", ""]
    assert out.column("was_mojibake").to_pylist() == [True, False, False]
    # all-ASCII batch takes the Arrow shortcut and adds the same columns
    b2 = pa.table({"text": pa.array(["abc", "def"], pa.string())})
    out2 = fix_encoding_batch(b2)
    assert out2.column("fixed_text").to_pylist() == ["abc", "def"]
    assert out2.column("was_mojibake").to_pylist() == [False, False]
