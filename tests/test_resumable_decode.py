"""Resumable media decode: per-shard lineage, skip-on-resume,
fingerprint invalidation, corrupt-payload tolerance."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_shards(tmp_path, n_shards=3, per=6):
    from exactextractr_ray.stages.multimodal import synth_jpeg_table

    media = tmp_path / "media"
    media.mkdir()
    for s in range(n_shards):
        t = synth_jpeg_table(per, hw=(16, 16))
        ids = pa.array(np.arange(per, dtype=np.int64) + s * 100)
        t = t.set_column(0, "media_id", ids)
        pq.write_table(t, str(media / f"shard{s}.parquet"))
    return str(media)


def test_resumable_decode_images(tmp_path, ray_session):
    from exactextractr_ray.pipelines.resumable_decode import (
        resumable_decode_images,
    )
    from exactextractr_ray.state.lineage import read_resumable

    media = _write_shards(tmp_path)
    out = str(tmp_path / "decoded")
    r1 = resumable_decode_images(media, out, target_hw=(4, 4))
    assert sorted(r1["written"]) == ["shard0", "shard1", "shard2"]
    assert r1["skipped"] == []
    df = read_resumable(out).to_pandas()
    assert len(df) == 18
    assert {0, 100, 200} <= set(df["media_id"] // 1 // 1)

    # resume: nothing recomputed
    r2 = resumable_decode_images(media, out, target_hw=(4, 4))
    assert r2["written"] == [] and len(r2["skipped"]) == 3

    # touching one shard invalidates exactly that partition
    p = os.path.join(media, "shard1.parquet")
    os.utime(p, (os.path.getatime(p), os.path.getmtime(p) + 5))
    r3 = resumable_decode_images(media, out, target_hw=(4, 4))
    assert r3["written"] == ["shard1"] and len(r3["skipped"]) == 2
    assert len(read_resumable(out).to_pandas()) == 18


def test_resumable_decode_skips_corrupt_rows(tmp_path, ray_session):
    from exactextractr_ray.pipelines.resumable_decode import (
        resumable_decode_images,
    )
    from exactextractr_ray.stages.multimodal import synth_jpeg_table
    from exactextractr_ray.state.lineage import read_resumable

    media = tmp_path / "media"
    media.mkdir()
    t = synth_jpeg_table(5, hw=(16, 16))
    payloads = t.column("payload").to_pylist()
    payloads[2] = b"\xff\xd8\xffgarbage"
    t = t.set_column(
        t.schema.get_field_index("payload"), "payload",
        pa.array(payloads, pa.binary()),
    )
    pq.write_table(t, str(media / "s0.parquet"))
    out = str(tmp_path / "decoded")
    resumable_decode_images(str(media), out, target_hw=(4, 4))
    df = read_resumable(out).to_pandas()
    assert sorted(df["media_id"]) == [0, 1, 3, 4]


def test_resumable_sample_frames(tmp_path, ray_session):
    from exactextractr_ray.pipelines.resumable_decode import (
        resumable_sample_frames,
    )
    from exactextractr_ray.stages.multimodal import synth_mjpeg_avi_table
    from exactextractr_ray.state.lineage import read_resumable

    media = tmp_path / "vids"
    media.mkdir()
    pq.write_table(
        synth_mjpeg_avi_table(3, hw=(16, 16), n_frames=4),
        str(media / "v0.parquet"),
    )
    out = str(tmp_path / "frames")
    r = resumable_sample_frames(str(media), out, k=2, target_hw=(4, 4))
    assert r["written"] == ["v0"]
    df = read_resumable(out).to_pandas()
    assert len(df) == 6  # 3 videos x 2 sampled frames
    assert set(df["frame_idx"]) == {0, 3}


def test_no_shards_raises(tmp_path, ray_session):
    from exactextractr_ray.pipelines.resumable_decode import (
        resumable_decode_images,
    )

    empty = tmp_path / "none"
    empty.mkdir()
    with pytest.raises(ValueError):
        resumable_decode_images(str(empty), str(tmp_path / "o"))
