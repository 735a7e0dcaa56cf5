"""Multimodal (image/audio/video) column stages.

Media travel as opaque ``binary`` columns with typed metadata columns
(media_type, width/height or sample_rate/duration). The decode step is
STUBBED — no image/audio codecs exist in this container — behind
``DeterministicFakeDecoder`` (a seeded pure function of the bytes, so the
whole pipeline is testable end-to-end) or ``CodecDecoder`` which raises
NotImplementedError until a real codec is wired in. Everything Ray-side —
schemas, actor-pool stage shape, batch sizing, output layout — is real:

* decode: actor-pool ``map_batches`` class (codec init is per-actor state);
* resize / frame-sample / feature-extract: vectorized numpy over the decoded
  fixed-shape tensors;
* embeddings come out as ``list<float>`` ready for the kNN stages.

Batch sizes must be SMALL for media (a 100 KB payload x 4096-row default
batch is 400 MB in one task) — the stage functions below default to 64.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

IMAGE_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("media_type", pa.string()),  # "image/png", ...
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
    ]
)


class CodecDecoder:
    """Real-codec decode stage: NOT IMPLEMENTED in this environment (no
    PIL/ffmpeg in the container). The stage exists so the pipeline shape is
    complete; swap in a codec by implementing decode_one."""

    def __init__(self, target_hw: tuple[int, int] = (32, 32)):
        self.target_hw = target_hw

    def decode_one(self, payload: bytes, width: int, height: int) -> np.ndarray:
        raise NotImplementedError(
            "no image codec available in this environment; use "
            "DeterministicFakeDecoder for pipeline testing"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        widths = batch.column("width").to_numpy()
        heights = batch.column("height").to_numpy()
        pixels = [
            self.decode_one(p, int(w), int(h))
            for p, w, h in zip(payloads, widths, heights)
        ]
        return _attach_pixels(batch, pixels, self.target_hw)


class DeterministicFakeDecoder(CodecDecoder):
    """Seeded fake decode: pixels are a pure function of the payload bytes
    (md5-seeded), so downstream stages have bit-stable, testable inputs at
    any parallelism."""

    def decode_one(self, payload: bytes, width: int, height: int) -> np.ndarray:
        seed = int(hashlib.md5(payload).hexdigest()[:8], 16)
        rng = np.random.default_rng(seed)
        h, w = self.target_hw
        return rng.integers(0, 256, size=(h, w), dtype=np.uint8).astype(np.float32)


def _attach_pixels(batch: pa.Table, pixels: list[np.ndarray], hw) -> pa.Table:
    flat = np.concatenate([p.ravel() for p in pixels]) if pixels else np.empty(0)
    n = hw[0] * hw[1]
    offsets = pa.array(
        np.arange(len(pixels) + 1, dtype=np.int32) * n, type=pa.int32()
    )
    col = pa.ListArray.from_arrays(offsets, pa.array(flat, type=pa.float32()))
    out = batch.drop_columns(["payload"])  # decoded: payload no longer needed
    out = out.append_column("pixels", col)
    out = out.append_column(
        "pix_h", pa.array([hw[0]] * len(pixels), pa.int32())
    )
    return out.append_column("pix_w", pa.array([hw[1]] * len(pixels), pa.int32()))


def decode_images(ds, target_hw=(32, 32), fake: bool = True, concurrency=(1, 8),
                  batch_size: int = 64):
    """Actor-pool decode stage (codec state per actor, small batches)."""
    cls = DeterministicFakeDecoder if fake else CodecDecoder
    return ds.map_batches(
        cls,
        fn_constructor_args=(target_hw,),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def image_features_batch(batch: pa.Table, n_bins: int = 16) -> pa.Table:
    """Vectorized feature extraction over decoded tensors: intensity
    histogram (normalized) + mean/std as an embedding column."""
    n = batch.num_rows
    ph = int(batch.column("pix_h")[0].as_py()) if n else 0
    pw = int(batch.column("pix_w")[0].as_py()) if n else 0
    flat = np.asarray(
        batch.column("pixels").combine_chunks().values, dtype=np.float32
    ).reshape(n, ph * pw) if n else np.empty((0, 0), dtype=np.float32)
    feats = []
    for i in range(n):
        hist, _ = np.histogram(flat[i], bins=n_bins, range=(0, 256))
        hist = hist / max(1, flat.shape[1])
        feats.append(
            np.concatenate([hist, [flat[i].mean() / 255.0, flat[i].std() / 255.0]])
        )
    mat = np.asarray(feats, dtype=np.float32) if feats else np.empty((0, n_bins + 2))
    offsets = pa.array(
        np.arange(n + 1, dtype=np.int32) * (n_bins + 2), type=pa.int32()
    )
    col = pa.ListArray.from_arrays(offsets, pa.array(mat.ravel(), type=pa.float32()))
    return batch.drop_columns(["pixels"]).append_column("embedding", col)


def synth_image_table(n: int, payload_kb: int = 4) -> pa.Table:
    """Deterministic fake image rows for tests/benchmarks."""
    rng = np.random.default_rng(42)
    payloads = [rng.integers(0, 256, payload_kb * 1024, dtype=np.uint8).tobytes()
                for _ in range(n)]
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "media_type": pa.array(["image/fake"] * n),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array([64] * n, pa.int32()),
            "height": pa.array([64] * n, pa.int32()),
        }
    )
