"""Resumable multimodal decode: media parquet shards -> decoded-feature
parquet partitions with per-shard lineage.

The 100-TB media-decode shape: input is a directory of parquet shards of
(media_id, media_type, payload, ...); each SHARD is a resume partition
(the natural unit — shards are how the corpus arrives from ingestion).
A crash or preemption loses at most one shard's work; re-running skips
every finished shard whose input file is unchanged (path + size + mtime
fingerprint). Built on state/lineage.resumable_write — the same
manifest/commit-after-data contract as the zonal resumable pipelines.

Corrupt payloads use the decode stages' ``on_error="skip"`` policy by
default: at corpus scale a bad byte-run must cost one row, not a shard.
"""

from __future__ import annotations

import glob
import os


def _file_fingerprint(path: str) -> str:
    st = os.stat(path)
    return f"{path}:{st.st_size}:{int(st.st_mtime)}"


def resumable_decode_images(
    media_dir: str,
    out_dir: str,
    target_hw=(32, 32),
    fake: bool = False,
    on_error: str = "skip",
    batch_size: int = 64,
    concurrency=(1, 8),
) -> dict:
    """Decode every parquet shard under ``media_dir`` into per-shard
    decoded-pixel partitions under ``out_dir``; returns the
    written/skipped summary from the lineage layer."""
    import ray.data

    from ..state.lineage import resumable_write
    from ..stages.multimodal import decode_images

    shards = sorted(glob.glob(os.path.join(media_dir, "*.parquet")))
    if not shards:
        raise ValueError(f"no parquet shards under {media_dir}")
    partitions = {
        os.path.splitext(os.path.basename(p))[0]: p for p in shards
    }

    def factory(key, path):
        ds = ray.data.read_parquet(path)
        return decode_images(
            ds, target_hw=target_hw, fake=fake, batch_size=batch_size,
            concurrency=concurrency, on_error=on_error,
        )

    return resumable_write(
        out_dir, "decode_images", partitions, factory,
        lambda key, path: _file_fingerprint(path),
    )


def resumable_sample_frames(
    media_dir: str,
    out_dir: str,
    k: int = 4,
    target_hw=(16, 16),
    fake: bool = False,
    on_error: str = "skip",
    batch_size: int = 16,
    concurrency=(1, 8),
) -> dict:
    """Frame-sample every video parquet shard under ``media_dir`` into
    per-shard sampled-frame partitions under ``out_dir``."""
    import ray.data

    from ..state.lineage import resumable_write
    from ..stages.multimodal import sample_frames

    shards = sorted(glob.glob(os.path.join(media_dir, "*.parquet")))
    if not shards:
        raise ValueError(f"no parquet shards under {media_dir}")
    partitions = {
        os.path.splitext(os.path.basename(p))[0]: p for p in shards
    }

    def factory(key, path):
        ds = ray.data.read_parquet(path)
        return sample_frames(
            ds, k=k, target_hw=target_hw, fake=fake, batch_size=batch_size,
            concurrency=concurrency, on_error=on_error,
        )

    return resumable_write(
        out_dir, "sample_frames", partitions, factory,
        lambda key, path: _file_fingerprint(path),
    )
