"""Archive ingestion (sources/archive.py): ZIP deflated/stored + tar/
tar.gz round-trips byte-identical, corrupt-shard skip policy, binary
members."""

import os

import numpy as np
import pytest

from exactextractr_ray.sources.archive import (
    read_archive_documents,
    write_tar_documents,
    write_zip_documents,
)


def _members(n=5):
    return [
        (f"d/{i:03d}.txt", (f"doc {i} " + "x" * i * 7).encode())
        for i in range(n)
    ] + [("bin.dat", bytes(range(256)))]


@pytest.mark.parametrize("kind", ["zip", "zip_stored", "tar", "targz"])
def test_roundtrip_byte_identical(ray_session, tmp_path, kind):
    members = _members()
    p = str(tmp_path / f"a.{kind}")
    if kind == "zip":
        write_zip_documents(p, members, compress=True)
    elif kind == "zip_stored":
        write_zip_documents(p, members, compress=False)
    else:
        write_tar_documents(p, members, gz=(kind == "targz"))
    df = read_archive_documents([p]).to_pandas()
    got = {(r.member): bytes(r.payload) for r in df.itertuples()}
    assert got == dict(members)
    assert (df["n_bytes"] == [len(b) for _n, b in members]).all()
    # binary member decodes with replacement, never raises
    assert "�" in df[df["member"] == "bin.dat"]["text"].iloc[0]


def test_mixed_shards_and_skip(ray_session, tmp_path):
    write_zip_documents(str(tmp_path / "good.zip"), _members(3))
    with open(tmp_path / "bad.zip", "wb") as f:
        f.write(b"PK\x03\x04corrupt garbage")
    paths = [str(tmp_path / "good.zip"), str(tmp_path / "bad.zip")]
    with pytest.raises(Exception):
        read_archive_documents(paths).to_pandas()
    df = read_archive_documents(paths, on_error="skip").to_pandas()
    assert len(df) == 4  # the good shard's members only
    assert set(df["archive"]) == {"good.zip"}
