"""PDF container codec + text extraction (functions/pdf.py) and its
pipeline wiring (stages/text.py extract_pdf_text_batch, sources/pages.py
PDF corpus fixture).

Evidence: byte-exact round-trips through this repo's own writer (classic
xref), REAL host PDFs exercising the modern xref-stream + object-stream
path (pdfTeX/docbook output, PDF 1.5, FlateDecode + PNG predictors), and
hand-built object fixtures for the lexer edge cases.
"""

import os

import numpy as np
import pyarrow as pa
import pytest

from exactextractr_ray.functions.pdf import (
    PdfFile,
    _Lexer,
    encode_simple_pdf,
    extract_content_text,
    parse_pdf,
)

HOST_PDFS = [
    "/usr/share/doc/shared-mime-info/shared-mime-info-spec.pdf",
    "/usr/share/doc/libtasn1-doc/libtasn1.pdf",
]


def test_roundtrip_multi_page_and_escapes():
    pages = [
        "Hello world\nLine two (with parens) and \\backslash",
        "Second page: 100% pure",
        "",
    ]
    info = parse_pdf(encode_simple_pdf(pages))
    assert info["n_pages"] == 3
    assert info["page_texts"] == pages
    assert info["version"] == "1.4"


def test_roundtrip_uncompressed():
    pages = ["no flate here"]
    data = encode_simple_pdf(pages, compress=False)
    assert b"FlateDecode" not in data
    assert parse_pdf(data)["page_texts"] == pages


def test_lexer_objects():
    lx = _Lexer(b"<< /A [1 2.5 (str) <414243> /N#20x true null 7 0 R] >>")
    d = lx.parse()
    assert d["/A"][:4] == [1, 2.5, b"str", b"ABC"]
    assert d["/A"][4] == "/N x"          # #20 hex escape in name
    assert d["/A"][5] is True and d["/A"][6] is None
    assert d["/A"][7] == ("ref", 7, 0)


def test_literal_string_escapes():
    lx = _Lexer(rb"(a\053b \n \164 (nested) \\ end)")
    s = lx.parse()
    assert s == b"a+b \n t (nested) \\ end"
    # octal \053 = '+', \164 = 't', balanced nested parens kept


def test_content_text_operators():
    content = (
        b"BT /F1 10 Tf (First) Tj 0 -12 Td (second) Tj "
        b"[(ker) -50 (ned) -300 (word)] TJ T* (line) ' ET"
    )
    txt = extract_content_text(content)
    assert txt == "First\nsecondkerned word\nline"


def test_corrupt_rejected():
    with pytest.raises(ValueError, match="PDF"):
        parse_pdf(b"not a pdf at all")


@pytest.mark.parametrize("path", HOST_PDFS)
def test_real_host_pdf_xref_stream_objstm(path):
    """Real PDF 1.5 files: cross-reference streams + compressed object
    streams + PNG-predictor xref data. Structural goldens + text sanity."""
    if not os.path.exists(path):
        pytest.skip("host fixture absent")
    data = open(path, "rb").read()
    pdf = PdfFile(data)
    # both host files keep every page in ObjStm-compressed objects
    info = parse_pdf(data)
    assert info["version"] == "1.5"
    if "shared-mime-info" in path:
        assert info["n_pages"] == 17
        assert "Shared MIME-info Database" in info["page_texts"][0]
        assert "Thomas Leonard" in info["page_texts"][0]
    else:
        assert info["n_pages"] == 36
        assert "Abstract Syntax Notation One" in info["page_texts"][0]
    # determinism: a second parse extracts identical text
    assert parse_pdf(data)["text"] == info["text"]


def _swap_content_filter(data: bytes, encode, filter_name: bytes) -> bytes:
    """Rewrite the fixture's page content stream with a different filter
    (offsets stay valid because the reconstruction scan ignores xref)."""
    import re as _re
    import zlib as _z

    m = _re.search(
        rb"<< /Filter /FlateDecode /Length (\d+) >>\nstream\n", data
    )
    ln = int(m.group(1))
    body_at = m.end()
    plain = _z.decompress(data[body_at : body_at + ln])
    enc = encode(plain)
    return (
        data[: m.start()]
        + b"<< /Filter " + filter_name
        + f" /Length {len(enc)} >>\nstream\n".encode()
        + enc
        + data[body_at + ln :]
    )


def test_filter_pipeline_ascii85_hex_rle():
    """ASCIIHex / ASCII85 / RunLength / chained [A85, Flate] content
    streams all decode to the same extracted text."""
    import base64
    import zlib as _z

    pages = ["filters (everywhere) 100%"]
    base = encode_simple_pdf(pages)

    hexed = _swap_content_filter(
        base, lambda p: p.hex().encode() + b">", b"/ASCIIHexDecode"
    )
    assert parse_pdf(hexed)["page_texts"] == pages

    a85 = _swap_content_filter(
        base, lambda p: base64.a85encode(p) + b"~>", b"/ASCII85Decode"
    )
    assert parse_pdf(a85)["page_texts"] == pages

    def rle(p):
        # naive literal runs of <=128 bytes + EOD
        out = bytearray()
        for i in range(0, len(p), 128):
            chunk = p[i : i + 128]
            out.append(len(chunk) - 1)
            out += chunk
        out.append(128)
        return bytes(out)

    rl = _swap_content_filter(base, rle, b"/RunLengthDecode")
    assert parse_pdf(rl)["page_texts"] == pages

    chain = _swap_content_filter(
        base,
        lambda p: base64.a85encode(_z.compress(p)) + b"~>",
        b"[ /ASCII85Decode /FlateDecode ]",
    )
    assert parse_pdf(chain)["page_texts"] == pages


def test_form_xobject_text_extracts():
    """Text inside a /Form XObject invoked with Do (letterheads, stamps)
    extracts too, with the form's own nested resources honored."""

    def obj(n, body):
        return f"{n} 0 obj\n".encode() + body + b"\nendobj\n"

    form_body = b"BT /F1 9 Tf (from the form) Tj ET"
    page_body = b"BT /F1 12 Tf (page text) Tj ET /Fm1 Do"
    data = b"%PDF-1.4\n"
    data += obj(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    data += obj(2, b"<< /Type /Pages /Count 1 /Kids [ 3 0 R ] "
                   b"/Resources << /XObject << /Fm1 6 0 R >> >> >>")
    data += obj(3, b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>")
    data += obj(4, b"<< /Length %d >>\nstream\n" % len(page_body)
                   + page_body + b"\nendstream")
    data += obj(6, b"<< /Subtype /Form /Length %d >>\nstream\n"
                   % len(form_body) + form_body + b"\nendstream")
    data += b"%%EOF\n"
    info = parse_pdf(data)
    assert info["n_pages"] == 1
    # page resources are INHERITED from the Pages node here
    assert info["page_texts"][0] == "page text\nfrom the form"


def test_tounicode_cmap_cid_font():
    """Type0/CID text (2-byte glyph codes) decodes through the font's
    /ToUnicode CMap: bfchar pairs, bfrange increment AND array forms,
    code width from codespacerange; Tf switches decoders mid-stream."""
    import zlib as _z

    cmap = (
        b"/CIDInit /ProcSet findresource begin\n"
        b"1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
        b"2 beginbfchar\n<0003> <0048>\n<0004> <00690021>\nendbfchar\n"
        b"2 beginbfrange\n"
        b"<0010> <0012> <0061>\n"                      # a b c
        b"<0020> <0021> [<20AC> <1F60>]\n"             # euro, greek
        b"endbfrange\nendcmap\n"
    )
    cstream = _z.compress(cmap)

    def obj(n, body):
        return f"{n} 0 obj\n".encode() + body + b"\nendobj\n"

    # show <0003 0010 0011 0012 0004> with the CID font, then ASCII with F1
    page_body = (
        b"BT /F2 12 Tf <00030010001100120004> Tj "
        b"/F1 12 Tf ( plain) Tj ET"
    )
    data = b"%PDF-1.4\n"
    data += obj(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    data += obj(2, b"<< /Type /Pages /Count 1 /Kids [ 3 0 R ] >>")
    data += obj(
        3,
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R /Resources "
        b"<< /Font << /F1 5 0 R /F2 6 0 R >> >> >>",
    )
    data += obj(4, b"<< /Length %d >>\nstream\n" % len(page_body)
                   + page_body + b"\nendstream")
    data += obj(5, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    data += obj(
        6,
        b"<< /Type /Font /Subtype /Type0 /BaseFont /Fake-Identity-H "
        b"/ToUnicode 7 0 R >>",
    )
    data += obj(7, b"<< /Filter /FlateDecode /Length %d >>\nstream\n"
                   % len(cstream) + cstream + b"\nendstream")
    data += b"%%EOF\n"
    info = parse_pdf(data)
    assert info["page_texts"][0] == "Habci! plain"


def test_encrypted_pdf_guard():
    data = encode_simple_pdf(["secret"])
    # splice a standard-security-handler dict in as a new object
    enc = (
        b"9 0 obj\n<< /Filter /Standard /V 2 /R 3 /O (x) /U (y) >>\n"
        b"endobj\n"
    )
    with pytest.raises(NotImplementedError, match="encrypted"):
        parse_pdf(data + enc)


def test_probe_and_sniff_dispatch():
    from exactextractr_ray.functions.codecs import probe_media, sniff_media

    data = encode_simple_pdf(["one", "two", "three"])
    assert sniff_media(data) == "application/pdf"
    p = probe_media(data)
    assert p["kind"] == "application/pdf" and p["frames"] == 3


def test_extract_pdf_text_batch_and_skip_policy():
    from exactextractr_ray.stages.text import extract_pdf_text_batch

    good = encode_simple_pdf(["fine text"])
    batch = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "pdf": pa.array([good, b"%PDF-1.4 broken"], pa.binary()),
        }
    )
    with pytest.raises(Exception):
        extract_pdf_text_batch(batch)
    out = extract_pdf_text_batch(batch, on_error="skip")
    assert out.num_rows == 1
    assert out.column("extracted_text").to_pylist() == ["fine text"]


def test_read_warc_documents_pdf_path(ray_session, tmp_path):
    """WARC -> sniff application/pdf -> header page probe -> extraction:
    non-PDF records drop, page counts and text round-trip."""
    from exactextractr_ray.sources.warc import (
        read_warc_documents,
        write_warc,
    )
    from exactextractr_ray.stages.text import extract_pdf_text_batch

    recs = [
        {"url": f"http://d.example/{i}.pdf",
         "warc_ts": "2026-01-01T00:00:00Z",
         "html": encode_simple_pdf([f"doc {i}", "page two"][: 1 + i % 2])}
        for i in range(5)
    ]
    recs.append({"url": "http://d.example/x.html",
                 "warc_ts": "2026-01-01T00:00:00Z",
                 "html": b"<html>nope</html>"})
    p = str(tmp_path / "c.warc.gz")
    write_warc(p, recs, gzip_members=True)
    out = (
        read_warc_documents(p)
        .map_batches(extract_pdf_text_batch, batch_format="pyarrow")
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert len(out) == 5
    assert out["n_pages"].tolist() == [1, 2, 1, 2, 1]
    assert out.loc[0, "extracted_text"] == "doc 0"
    assert out.loc[1, "extracted_text"] == "doc 1\npage two"


def test_pdf_corpus_fixture_inverts(ray_session):
    """The documents->PDF fixture round-trips text byte-exactly through
    the real writer + parser (the driver query's invariant)."""
    from exactextractr_ray.sources.pages import read_pdf_docs
    from exactextractr_ray.stages.text import extract_pdf_text_batch

    out = (
        read_pdf_docs("/root/testdata/sf0.001")
        .map_batches(extract_pdf_text_batch, batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
    )
    assert len(out) > 0
    assert (out["extracted_text"] == out["text"]).all()
