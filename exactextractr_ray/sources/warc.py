"""WARC 1.0 source — Common-Crawl-native ingestion.

The corpus tables in testdata are Parquet (the BASELINE.json input hint),
but real crawls arrive as WARC: concatenated records, each a header block
(``WARC/1.0`` + ``Name: value`` lines) and a Content-Length-delimited body;
Common Crawl stores each record as its own gzip member. This reader turns
``response`` records into the same (url, warc_ts, html, http_status) shape
the pages fixture uses, so every downstream operator (extract_text, links,
dedup, ...) runs on real crawl files unchanged.

Scale shape: WARC files are the parallel unit (records are not splittable
without an external index — the same contract CC's own tooling uses), so
``read_warc`` is ``read_binary_files`` + a ``flat_map``-style per-file
parse inside ``map_batches``. A 100 TB crawl is ~100k x 1 GB files: ample
parallelism with zero coordination. Pure stdlib (struct/zlib) — no
warcio in this environment.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

_CRLF = b"\r\n"


def _gzip_members(buf: bytes) -> bytes:
    """Decompress a stream of concatenated gzip members (the CC layout)."""
    out = []
    d = zlib.decompressobj(16 + zlib.MAX_WBITS)
    data = buf
    while data:
        out.append(d.decompress(data))
        data = d.unused_data
        if not data:
            break
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
    return b"".join(out)


def parse_warc_bytes(buf: bytes) -> list[dict]:
    """Parse one WARC file's bytes into response-record dicts:
    (url, warc_ts, html, http_status). Non-response records (warcinfo,
    request, metadata) are skipped, like every CC text pipeline does."""
    if buf[:2] == b"\x1f\x8b":
        buf = _gzip_members(buf)
    out: list[dict] = []
    pos = 0
    n = len(buf)
    while pos < n:
        # skip inter-record blank lines
        while pos < n and buf[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            break
        if not buf.startswith(b"WARC/", pos):
            raise ValueError(f"malformed WARC: no version line at {pos}")
        hdr_end = buf.index(_CRLF + _CRLF, pos)
        headers: dict[str, str] = {}
        for line in buf[pos:hdr_end].split(_CRLF)[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().decode().lower()] = v.strip().decode()
        length = int(headers["content-length"])
        body = buf[hdr_end + 4 : hdr_end + 4 + length]
        pos = hdr_end + 4 + length
        if headers.get("warc-type") != "response":
            continue
        # body = HTTP response: status line + headers, CRLFCRLF, payload
        http_end = body.find(_CRLF + _CRLF)
        status = 0
        payload = body
        if http_end >= 0 and body[:5] == b"HTTP/":
            status_line = body[: body.find(_CRLF)].decode("latin-1")
            parts = status_line.split(" ", 2)
            status = int(parts[1]) if len(parts) > 1 and parts[1].isdigit() else 0
            payload = body[http_end + 4 :]
        out.append(
            {
                "url": headers.get("warc-target-uri", ""),
                "warc_ts": headers.get("warc-date", ""),
                "html": payload,
                "http_status": status,
            }
        )
    return out


def read_warc(paths):
    """Dataset of (url, warc_ts, html binary, http_status) from WARC file(s)
    — plain or per-record/whole-file gzip. One task per file."""
    import ray.data

    files = ray.data.read_binary_files(paths)

    def parse(b: pa.Table) -> pa.Table:
        urls: list[str] = []
        tss: list[str] = []
        htmls: list[bytes] = []
        sts: list[int] = []
        for blob in b.column("bytes").to_pylist():
            for rec in parse_warc_bytes(blob):
                urls.append(rec["url"])
                tss.append(rec["warc_ts"])
                htmls.append(rec["html"])
                sts.append(rec["http_status"])
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(tss, pa.string()),
                "html": pa.array(htmls, pa.binary()),
                "http_status": pa.array(
                    np.asarray(sts, np.int64), pa.int64()
                ),
            }
        )

    return files.map_batches(parse, batch_format="pyarrow")


def write_warc(
    path: str,
    records: list[dict],
    gzip_members: bool = False,
) -> None:
    """Write (url, warc_ts, html[, http_status]) dicts as a WARC 1.0 file
    of response records — the round-trip test fixture generator (and a
    usable crawl-export sink). With ``gzip_members`` each record becomes
    its own gzip member, the Common Crawl layout."""
    import gzip as _gzip

    chunks: list[bytes] = []
    for r in records:
        status = int(r.get("http_status", 200))
        payload = r["html"] if isinstance(r["html"], bytes) else r["html"].encode()
        http = (
            f"HTTP/1.1 {status} OK\r\nContent-Type: text/html\r\n\r\n"
        ).encode() + payload
        hdr = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            + f"WARC-Target-URI: {r['url']}\r\n".encode()
            + f"WARC-Date: {r['warc_ts']}\r\n".encode()
            + f"Content-Length: {len(http)}\r\n".encode()
            + b"Content-Type: application/http; msgtype=response\r\n"
            + _CRLF
        )
        rec = hdr + http + _CRLF + _CRLF
        chunks.append(_gzip.compress(rec) if gzip_members else rec)
    with open(path, "wb") as f:
        f.write(b"".join(chunks))


def read_warc_media(paths):
    """Dataset of decodable MEDIA rows from WARC file(s): response payloads
    whose magic bytes sniff as image/audio/video, in the multimodal stage
    schema (media_id, media_type, payload, width/height, n_frames, fps,
    n_samples — filled by the header-only ``probe_media``, so dimension /
    duration filters run BEFORE any decode cost; the fake=False stages
    still read authoritative values from the container itself).

    This is the Common-Crawl media path: the same per-file parallel parse
    as ``read_warc``, with the payload sniff replacing text extraction —
    crawl archives feed decode_images / sample_frames / audio_features
    directly. media_id is a stable 63-bit hash of the URL (deterministic
    across runs and parallelism)."""
    import hashlib

    import ray.data

    from ..functions.codecs import probe_media

    files = ray.data.read_binary_files(paths)

    def parse(b: pa.Table) -> pa.Table:
        ids: list[int] = []
        urls: list[str] = []
        kinds: list[str] = []
        payloads: list[bytes] = []
        ws: list[int] = []
        hs: list[int] = []
        nframes: list[int] = []
        rates: list[int] = []
        for blob in b.column("bytes").to_pylist():
            for rec in parse_warc_bytes(blob):
                info = probe_media(rec["html"])
                kind = info["kind"]
                if kind.split("/")[0] not in ("image", "audio", "video"):
                    continue
                ids.append(
                    int.from_bytes(
                        hashlib.md5(rec["url"].encode()).digest()[:8],
                        "big",
                    )
                    >> 1
                )
                urls.append(rec["url"])
                kinds.append(kind)
                payloads.append(rec["html"])
                ws.append(info["width"])
                hs.append(info["height"])
                nframes.append(info["frames"])
                rates.append(info["sample_rate"])
        return pa.table(
            {
                "media_id": pa.array(np.asarray(ids, np.int64), pa.int64()),
                "url": pa.array(urls, pa.string()),
                "media_type": pa.array(kinds, pa.string()),
                "payload": pa.array(payloads, pa.binary()),
                "width": pa.array(np.asarray(ws, np.int32), pa.int32()),
                "height": pa.array(np.asarray(hs, np.int32), pa.int32()),
                "n_frames": pa.array(
                    np.asarray(nframes, np.int32), pa.int32()
                ),
                "fps": pa.array(
                    np.asarray(rates, np.float32), pa.float32()
                ),
                "n_samples": pa.array(
                    np.asarray(nframes, np.int64), pa.int64()
                ),
            }
        )

    return files.map_batches(parse, batch_format="pyarrow")


def read_warc_documents(paths):
    """Dataset of document-format rows (PDFs) from WARC file(s): response
    payloads sniffing as application/pdf, with the header-only page count
    (probe_media) so page filters run before any parse/extract cost —
    the Common-Crawl PDF ingestion path feeding
    stages.text.extract_pdf_text_batch. doc_id is the same stable 63-bit
    url hash as read_warc_media."""
    import hashlib

    import ray.data

    from ..functions.codecs import probe_media

    files = ray.data.read_binary_files(paths)

    def parse(b: pa.Table) -> pa.Table:
        ids: list[int] = []
        urls: list[str] = []
        payloads: list[bytes] = []
        pages: list[int] = []
        for blob in b.column("bytes").to_pylist():
            for rec in parse_warc_bytes(blob):
                info = probe_media(rec["html"])
                if info["kind"] != "application/pdf":
                    continue
                ids.append(
                    int.from_bytes(
                        hashlib.md5(rec["url"].encode()).digest()[:8],
                        "big",
                    )
                    >> 1
                )
                urls.append(rec["url"])
                payloads.append(rec["html"])
                pages.append(info["frames"])
        return pa.table(
            {
                "doc_id": pa.array(np.asarray(ids, np.int64), pa.int64()),
                "url": pa.array(urls, pa.string()),
                "pdf": pa.array(payloads, pa.binary()),
                "n_pages": pa.array(np.asarray(pages, np.int32), pa.int32()),
            }
        )

    return files.map_batches(parse, batch_format="pyarrow")
