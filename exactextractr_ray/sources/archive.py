"""ZIP / TAR archive ingestion sources — crawl dumps and dataset drops
frequently ship as archives of member documents rather than WARCs.

Engineering choice: the container parsing here deliberately uses the
stdlib ``zipfile``/``tarfile`` modules (present in the environment)
rather than from-scratch parsers — unlike the media codecs, these
formats have a trusted in-environment implementation, and the value is
the RAY-SIDE shape: ``read_binary_files`` over the archive shards,
then a per-task member walk that emits one row per member file with
the same (url-ish path, bytes/text) contract as the WARC sources.
Archives are the natural 100-TB shard unit — one archive per task,
members never leave the task unexploded, corrupt members skippable.

``write_zip_documents`` / ``write_tar_documents`` are the fixture
writers (stored or deflated members), so round-trips prove
byte-identity through real zlib streams.
"""

from __future__ import annotations

import io
import posixpath
import tarfile
import zipfile

import pyarrow as pa
import ray.data

__all__ = [
    "read_archive_documents",
    "write_zip_documents",
    "write_tar_documents",
]


def write_zip_documents(
    path: str, members: list[tuple[str, bytes]], compress: bool = True
) -> None:
    with zipfile.ZipFile(
        path, "w",
        zipfile.ZIP_DEFLATED if compress else zipfile.ZIP_STORED,
    ) as z:
        for name, body in members:
            z.writestr(name, body)


def write_tar_documents(
    path: str, members: list[tuple[str, bytes]], gz: bool = True
) -> None:
    with tarfile.open(path, "w:gz" if gz else "w") as t:
        for name, body in members:
            info = tarfile.TarInfo(name)
            info.size = len(body)
            info.mtime = 0  # deterministic fixtures
            t.addfile(info, io.BytesIO(body))


def _walk_archive(path: str, blob: bytes, on_error: str):
    rows = []
    try:
        if blob[:4] == b"PK\x03\x04" or blob[:4] == b"PK\x05\x06":
            with zipfile.ZipFile(io.BytesIO(blob)) as z:
                for info in z.infolist():
                    if info.is_dir():
                        continue
                    try:
                        rows.append((info.filename, z.read(info)))
                    except Exception:
                        if on_error == "raise":
                            raise
        else:
            with tarfile.open(fileobj=io.BytesIO(blob)) as t:
                for info in t:
                    if not info.isfile():
                        continue
                    f = t.extractfile(info)
                    if f is not None:
                        rows.append((info.name, f.read()))
    except Exception:
        if on_error == "raise":
            raise
        return []
    return rows


def read_archive_documents(paths, on_error: str = "raise"):
    """Archive files (.zip / .tar / .tar.gz) -> Dataset of one row per
    member file: (archive, member, n_bytes, payload, text) where
    ``text`` is the UTF-8 decode (replacement chars on binary members).

    Scale shape: archives stay whole per task (read_binary_files);
    members are exploded inside ``map_batches`` and the archive blob
    never re-ships. ``on_error="skip"`` drops unreadable archives /
    members (the crawl-dump default)."""
    if on_error not in ("raise", "skip"):
        raise ValueError("on_error must be 'raise' or 'skip'")
    files = ray.data.read_binary_files(paths, include_paths=True)

    def explode(batch: pa.Table) -> pa.Table:
        archives, members, sizes, payloads, texts = [], [], [], [], []
        for path, blob in zip(
            batch.column("path").to_pylist(),
            batch.column("bytes").to_pylist(),
        ):
            base = posixpath.basename(path)
            for name, body in _walk_archive(path, blob, on_error):
                archives.append(base)
                members.append(name)
                sizes.append(len(body))
                payloads.append(body)
                texts.append(body.decode("utf-8", "replace"))
        return pa.table(
            {
                "archive": pa.array(archives, pa.string()),
                "member": pa.array(members, pa.string()),
                "n_bytes": pa.array(sizes, pa.int64()),
                "payload": pa.array(payloads, pa.binary()),
                "text": pa.array(texts, pa.string()),
            }
        )

    return files.map_batches(explode, batch_format="pyarrow", batch_size=4)
