"""Multimodal (image/audio/video) column stages.

Media travel as opaque ``binary`` columns with typed metadata columns
(media_type, width/height or sample_rate/duration). Decode is REAL for
every format implementable from public specs without native libraries —
images: PNG (all color types/depths/Adam7), BMP, JPEG (baseline +
progressive, EXIF orientation; functions/jpeg.py), GIF, ICO favicons,
Netpbm; audio: WAV, AIFF, AU incl. G.711 (functions/audio.py); video:
MJPEG AVI, Motion-JPEG MP4, I_PCM-coded H.264 MP4 and animated GIF
(functions/avi.py / mp4.py / h264.py / gif.py; any-codec MP4 probes +
sample extraction via ISO-BMFF tables, with avcC/SPS-exact dimensions,
profile and fps for every AVC file);
WebP lossless VP8L incl. the alpha plane of lossy files
(functions/webp.py, validated bit-exact against libwebp).
Only formats genuinely requiring native codecs (entropy-coded
H.264/HEVC — see functions/h264.py for why, WebP lossy
VP8, MP3) raise
NotImplementedError, with ``DeterministicFakeDecoder`` (a seeded pure
function of the bytes) keeping those pipelines testable end-to-end.
Everything Ray-side —
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
from struct import error as struct_error
from zlib import error as zlib_error

import numpy as np
import pyarrow as pa

# what a corrupt/unsupported web payload can raise out of the pure-python
# codecs — the skip policy catches exactly these, not programming errors
_DECODE_ERRORS = (ValueError, NotImplementedError, IndexError, KeyError,
                  struct_error, zlib_error)

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
    """Real-codec decode stage: PNG/BMP/ICO/Netpbm via functions/codecs.py,
    baseline+progressive JPEG (with EXIF orientation) via the from-spec
    T.81 codec in functions/jpeg.py, GIF via functions/gif.py. Formats
    needing native libraries raise NotImplementedError. Decoded images
    are converted to integer luma and nearest-neighbor-resampled to
    ``target_hw`` (both exact integer ops: bit-stable at any
    parallelism).

    ``on_error="skip"`` drops undecodable payloads instead of failing the
    batch task — at web scale a corpus ALWAYS contains corrupt bytes, and
    one bad payload must not kill a 64-row task (dropped count = input
    rows − output rows, deterministic). The default "raise" keeps
    correctness tests strict."""

    def __init__(self, target_hw: tuple[int, int] = (32, 32),
                 on_error: str = "raise"):
        if on_error not in ("raise", "skip"):
            raise ValueError("on_error must be 'raise' or 'skip'")
        self.target_hw = target_hw
        self.on_error = on_error

    def decode_one(self, payload: bytes, width: int, height: int) -> np.ndarray:
        from ..functions import codecs

        kind = codecs.sniff_media(payload)
        if kind == "image/png":
            img = codecs.decode_png(payload)
        elif kind == "image/bmp":
            img = codecs.decode_bmp(payload)
        elif kind == "image/jpeg":
            from ..functions.jpeg import (
                apply_orientation,
                decode_jpeg,
                exif_orientation,
            )

            # web JPEGs are frequently camera-rotated via EXIF tag 274
            img = apply_orientation(decode_jpeg(payload),
                                    exif_orientation(payload))
        elif kind == "image/gif":
            from ..functions.gif import decode_gif

            img = decode_gif(payload)
        elif kind == "image/webp":
            from ..functions.webp import decode_webp

            # lossless (VP8L) decodes; lossy raises NotImplementedError,
            # which the on_error="skip" policy classifies like any other
            # native-codec-only payload
            img = decode_webp(payload)
        elif kind == "image/ico":
            img = codecs.decode_ico(payload)
        elif kind == "image/pnm":
            img = codecs.decode_pnm(payload)
        else:
            raise NotImplementedError(
                f"no codec for {kind} in this environment (PNG/BMP/JPEG "
                "decode natively; use DeterministicFakeDecoder for other "
                "formats)"
            )
        gray = codecs.to_grayscale(img)
        return codecs.resize_nearest(gray, self.target_hw).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        widths = batch.column("width").to_numpy()
        heights = batch.column("height").to_numpy()
        if self.on_error == "raise":
            pixels = [
                self.decode_one(p, int(w), int(h))
                for p, w, h in zip(payloads, widths, heights)
            ]
            return _attach_pixels(batch, pixels, self.target_hw)
        pixels, keep = [], []
        for i, (p, w, h) in enumerate(zip(payloads, widths, heights)):
            try:
                pixels.append(self.decode_one(p, int(w), int(h)))
                keep.append(i)
            except _DECODE_ERRORS:
                continue
        return _attach_pixels(batch.take(keep), pixels, self.target_hw)


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
                  batch_size: int = 64, on_error: str = "raise"):
    """Actor-pool decode stage (codec state per actor, small batches).
    ``on_error="skip"`` is the web-corpus setting: corrupt payloads drop
    instead of failing the task."""
    cls = DeterministicFakeDecoder if fake else CodecDecoder
    return ds.map_batches(
        cls,
        fn_constructor_args=(target_hw, on_error),
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
    if n:
        npix = flat.shape[1]
        # one add.at pass builds every row's histogram (no per-image loop)
        bins = np.clip((flat * (n_bins / 256.0)).astype(np.int64), 0, n_bins - 1)
        hist = np.zeros((n, n_bins), dtype=np.float64)
        rows = np.repeat(np.arange(n), npix)
        np.add.at(hist, (rows, bins.ravel()), 1.0)
        hist /= max(1, npix)
        mat = np.concatenate(
            [
                hist,
                flat.mean(axis=1, keepdims=True) / 255.0,
                flat.std(axis=1, keepdims=True) / 255.0,
            ],
            axis=1,
        ).astype(np.float32)
    else:
        mat = np.empty((0, n_bins + 2), dtype=np.float32)
    offsets = pa.array(
        np.arange(n + 1, dtype=np.int32) * (n_bins + 2), type=pa.int32()
    )
    col = pa.ListArray.from_arrays(offsets, pa.array(mat.ravel(), type=pa.float32()))
    return batch.drop_columns(["pixels"]).append_column("embedding", col)


def dhash_batch(batch: pa.Table, id_col: str = "media_id") -> pa.Table:
    """64-bit difference hash (dHash) per DECODED image — the standard
    perceptual near-dup signature (LAION-style image dedup uses exactly
    this shape: tiny luma thumbnail, horizontal gradient sign bits).

    Expects the decode stage's output: ``pixels`` as an (8*9) luma list
    (decode with ``target_hw=(8, 9)``); bit (r, c) = 1 iff
    px[r, c+1] > px[r, c], packed little-endian into a uint64. All integer
    comparisons on exact decoded values — bit-stable at any parallelism."""
    n = batch.num_rows
    ph = int(batch.column("pix_h")[0].as_py()) if n else 8
    pw = int(batch.column("pix_w")[0].as_py()) if n else 9
    if (ph, pw) != (8, 9):
        raise ValueError(f"dhash_batch needs (8, 9) thumbnails, got {(ph, pw)}")
    if n == 0:
        return pa.table(
            {id_col: pa.array([], pa.int64()), "dhash": pa.array([], pa.uint64())}
        )
    px = np.asarray(
        batch.column("pixels").combine_chunks().values, dtype=np.float32
    ).reshape(n, 8, 9)
    bits = (px[:, :, 1:] > px[:, :, :-1]).astype(np.uint64).reshape(n, 64)
    hashes = (bits << np.arange(64, dtype=np.uint64)[None, :]).sum(
        axis=1, dtype=np.uint64
    )
    return pa.table(
        {
            id_col: batch.column(id_col),
            "dhash": pa.array(hashes, pa.uint64()),
        }
    )


def image_dhash_pairs(
    ds,
    max_hamming: int = 6,
    fake: bool = False,
    id_col: str = "media_id",
    concurrency=(1, 8),
    batch_size: int = 64,
    on_error: str = "raise",
):
    """Image near-duplicate pairs by perceptual dHash + pigeonhole Hamming
    banding: real codec decode (actor pool) -> 8x9 luma thumbnail -> 64-bit
    dHash -> exact pairs with hamming <= max_hamming via
    stages.dedup.hamming_pairs. Payload bytes never shuffle — after decode
    only (id, uint64) signature rows move, so the exchange is
    corpus-size-bounded regardless of image sizes. Output: (doc_a, doc_b,
    hamming) with doc_a < doc_b."""
    from .dedup import hamming_pairs

    dec = decode_images(
        ds, target_hw=(8, 9), fake=fake, concurrency=concurrency,
        batch_size=batch_size, on_error=on_error,
    )
    sigs = dec.map_batches(
        dhash_batch, batch_format="pyarrow", fn_kwargs={"id_col": id_col}
    )
    return hamming_pairs(sigs, max_hamming, id_col=id_col, sig_col="dhash")


def synth_dhash_png_table(n: int = 48, hw: tuple[int, int] = (16, 18)) -> pa.Table:
    """Real-PNG fixture with an SQL-expressible pixel rule that yields
    designed near-duplicate groups: image i in group g = i//4 with
    perturbation d = i%4 has GRAYSCALE pixels
    p(y, x) = (g*53 + y*17 + x*29 + d*100*[(y*18 + x) % 7 == 0]) % 256,
    so group members differ on ~1/7 of pixels — a mix of exact dups,
    near dups and far pairs a DuckDB oracle recomputes from the rule."""
    from ..functions.codecs import encode_png

    h, w = hw
    y, x = np.mgrid[0:h, 0:w]
    payloads = []
    for i in range(n):
        g, d = i // 4, i % 4
        img = (
            (g * 53 + y * 17 + x * 29 + d * 100 * (((y * 18 + x) % 7) == 0))
            % 256
        ).astype(np.uint8)
        payloads.append(encode_png(img))
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "media_type": pa.array(["image/png"] * n),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array([w] * n, pa.int32()),
            "height": pa.array([h] * n, pa.int32()),
        }
    )


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


def synth_jpeg_table(n: int, hw: tuple[int, int] = (24, 24)) -> pa.Table:
    """Deterministic REAL-JPEG image rows (encoded with functions/jpeg.py):
    the fake=False decode path runs end-to-end on these. Smooth gradient
    content (JPEG is lossy; gradients survive within ~1 LSB)."""
    from ..functions.jpeg import encode_jpeg

    h, w = hw
    x, y = np.meshgrid(np.linspace(0, 255, w), np.linspace(0, 255, h))
    payloads = []
    for i in range(n):
        img = np.clip((x + y) / 2 + 7 * i, 0, 255).astype(np.uint8)
        if i % 2:
            img = np.stack([img, 255 - img, img // 2], axis=-1)
        payloads.append(encode_jpeg(img, quality=95, subsampling="4:4:4"))
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "media_type": pa.array(["image/jpeg"] * n),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array([w] * n, pa.int32()),
            "height": pa.array([h] * n, pa.int32()),
        }
    )


def synth_mjpeg_avi_table(
    n: int, hw: tuple[int, int] = (32, 48), n_frames: int = 6,
    fps: float = 12.0,
) -> pa.Table:
    """Deterministic REAL MJPEG-AVI video rows (functions/avi.py +
    functions/jpeg.py): the FrameSampler fake=False path runs end-to-end."""
    from ..functions.avi import encode_mjpeg_avi
    from ..functions.jpeg import encode_jpeg

    h, w = hw
    x, y = np.meshgrid(np.linspace(0, 255, w), np.linspace(0, 255, h))
    base = ((x + y) / 2).astype(np.uint8)
    payloads = []
    for i in range(n):
        frames = [
            encode_jpeg(
                np.clip(base.astype(int) + 11 * i + 17 * f, 0, 255)
                .astype(np.uint8),
                quality=95, subsampling="4:4:4",
            )
            for f in range(n_frames)
        ]
        payloads.append(encode_mjpeg_avi(frames, w, h, fps=fps))
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "media_type": pa.array(["video/avi"] * n),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array([w] * n, pa.int32()),
            "height": pa.array([h] * n, pa.int32()),
            "n_frames": pa.array([n_frames] * n, pa.int32()),
            "fps": pa.array(np.full(n, fps, np.float32), pa.float32()),
        }
    )


def synth_mjpeg_mp4_table(
    n: int, hw: tuple[int, int] = (32, 48), n_frames: int = 6,
    fps: float = 12.0, co64: bool = False,
) -> pa.Table:
    """Deterministic REAL Motion-JPEG MP4 video rows (functions/mp4.py +
    functions/jpeg.py): ISO-BMFF sample tables under FrameSampler
    fake=False. Same pixel content as synth_mjpeg_avi_table so the two
    containers can be cross-checked frame-for-frame."""
    from ..functions.jpeg import encode_jpeg
    from ..functions.mp4 import encode_mjpeg_mp4

    h, w = hw
    x, y = np.meshgrid(np.linspace(0, 255, w), np.linspace(0, 255, h))
    base = ((x + y) / 2).astype(np.uint8)
    payloads = []
    for i in range(n):
        frames = [
            encode_jpeg(
                np.clip(base.astype(int) + 11 * i + 17 * f, 0, 255)
                .astype(np.uint8),
                quality=95, subsampling="4:4:4",
            )
            for f in range(n_frames)
        ]
        payloads.append(encode_mjpeg_mp4(frames, w, h, fps=fps, co64=co64))
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "media_type": pa.array(["video/mp4"] * n),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array([w] * n, pa.int32()),
            "height": pa.array([h] * n, pa.int32()),
            "n_frames": pa.array([n_frames] * n, pa.int32()),
            "fps": pa.array(np.full(n, fps, np.float32), pa.float32()),
        }
    )


def synth_gif_video_table(
    n: int, hw: tuple[int, int] = (20, 28), n_frames: int = 5
) -> pa.Table:
    """Deterministic REAL animated-GIF rows (functions/gif.py) in the
    video schema — frame sampling treats animations as videos."""
    from ..functions.gif import encode_gif

    h, w = hw
    rng = np.random.default_rng(46)
    pal = rng.integers(0, 256, (8, 3), dtype=np.uint8)
    payloads = []
    for i in range(n):
        frames = [
            pal[(rng.integers(0, 8, (h, w)) + i) % 8]
            for _ in range(n_frames)
        ]
        payloads.append(encode_gif(frames, delays_ms=[100] * n_frames))
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "media_type": pa.array(["image/gif"] * n),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array([w] * n, pa.int32()),
            "height": pa.array([h] * n, pa.int32()),
            "n_frames": pa.array([n_frames] * n, pa.int32()),
            "fps": pa.array(np.full(n, 10.0, np.float32), pa.float32()),
        }
    )


def synth_png_table(n: int, hw: tuple[int, int] = (24, 24)) -> pa.Table:
    """Deterministic REAL-PNG image rows (encoded with functions/codecs.py):
    the fake=False decode path runs end-to-end on these."""
    from ..functions.codecs import encode_png

    rng = np.random.default_rng(45)
    h, w = hw
    payloads = []
    for i in range(n):
        if i % 2 == 0:
            img = rng.integers(0, 256, (h, w), dtype=np.uint8)  # gray
        else:
            img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)  # RGB
        payloads.append(encode_png(img))
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "media_type": pa.array(["image/png"] * n),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array([w] * n, pa.int32()),
            "height": pa.array([h] * n, pa.int32()),
        }
    )


# ---------------- video: frame sampling ----------------

VIDEO_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("media_type", pa.string()),  # "video/fake", ...
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("n_frames", pa.int32()),
        ("fps", pa.float32()),
    ]
)


class FrameSampler:
    """Actor-pool frame-sample stage: decode ``k`` evenly spaced frames per
    video to ``target_hw`` tensors. ``fake=False`` is REAL for the
    containers decodable from public specs without native libraries —
    MJPEG AVI (functions/avi.py: RIFF walk, per-frame JPEG), MJPEG and
    I_PCM-H.264 MP4 (functions/mp4.py / h264.py) and animated
    GIF (functions/gif.py: composited frames); other containers raise
    NotImplementedError. ``fake=True`` uses a payload+frame-index-seeded
    pure function so the plumbing (even-index selection, tensor layout,
    per-frame rows) is bit-stable and testable at any parallelism."""

    def __init__(self, k: int = 4, target_hw=(16, 16), fake: bool = True,
                 on_error: str = "raise"):
        if on_error not in ("raise", "skip"):
            raise ValueError("on_error must be 'raise' or 'skip'")
        self.k = k
        self.target_hw = target_hw
        self.fake = fake
        self.on_error = on_error

    def decode_frame(self, payload: bytes, frame_idx: int) -> np.ndarray:
        if not self.fake:
            raise NotImplementedError(
                "real decode goes through _real_frames (container-level); "
                "decode_frame is the fake-path entry only"
            )
        seed = int(hashlib.md5(payload + frame_idx.to_bytes(4, "little")).hexdigest()[:8], 16)
        rng = np.random.default_rng(seed)
        h, w = self.target_hw
        return rng.integers(0, 256, size=(h, w), dtype=np.uint8).astype(np.float32)

    @staticmethod
    def _take(nf: int, k: int) -> list[int]:
        return np.unique(
            np.linspace(0, max(nf - 1, 0), min(k, nf)).astype(np.int64)
        ).tolist()

    def _real_frames(self, payload: bytes):
        """Container parse + decode of the sampled frames only. Returns
        (frame_indices, fps, [gray target_hw float32 tensors])."""
        from ..functions import codecs

        kind = codecs.sniff_media(payload)
        if kind == "video/avi":
            from ..functions.avi import decode_avi_frames, parse_avi

            nf = len(parse_avi(payload)["frames"])
            take = self._take(nf, self.k)
            frames, fps = decode_avi_frames(payload, indices=take)
        elif kind == "video/mp4":
            from ..functions.mp4 import decode_mp4_frames, parse_mp4

            nf = parse_mp4(payload)["n_frames"]
            take = self._take(nf, self.k)
            frames, fps = decode_mp4_frames(payload, indices=take)
        elif kind == "video/webm":
            from ..functions.webm import decode_webm_frames, parse_webm

            nf = parse_webm(payload)["n_frames"]
            take = self._take(nf, self.k)
            frames, fps = decode_webm_frames(payload, indices=take)
        elif kind == "image/gif":
            from ..functions.gif import decode_gif_frames

            all_frames, delays = decode_gif_frames(payload)
            nf = len(all_frames)
            take = self._take(nf, self.k)
            frames = [all_frames[i] for i in take]
            mean_delay = (sum(delays) / len(delays) / 1000.0) if delays else 0
            fps = (1.0 / mean_delay) if mean_delay else 0.0
        else:
            raise NotImplementedError(
                f"no video container codec for {kind} in this environment "
                "(MJPEG AVI / MJPEG+I_PCM-H.264 MP4 / V_MJPEG WebM / "
                "animated GIF decode natively; "
                "use fake=True for other formats)"
            )
        tensors = [
            codecs.resize_nearest(codecs.to_grayscale(f), self.target_hw)
            .astype(np.float32)
            for f in frames
        ]
        return take, fps, tensors

    def __call__(self, batch: pa.Table) -> pa.Table:
        """One output row PER SAMPLED FRAME: (media_id, frame_idx, t_sec,
        pixels) — downstream image stages apply unchanged."""
        ids = batch.column("media_id").to_numpy()
        payloads = batch.column("payload").to_pylist()
        n_frames = batch.column("n_frames").to_numpy()
        fps = batch.column("fps").to_numpy()
        out_id, out_fi, out_t, tensors = [], [], [], []
        for mid, p, nf, f in zip(ids, payloads, n_frames, fps):
            if not self.fake:
                try:
                    take, fps_real, tens = self._real_frames(p)
                except _DECODE_ERRORS:
                    if self.on_error == "skip":
                        continue
                    raise
                f = fps_real or float(f)
                for fi, t in zip(take, tens):
                    out_id.append(int(mid))
                    out_fi.append(fi)
                    out_t.append(fi / float(f) if f else 0.0)
                    tensors.append(t)
                continue
            nf = int(nf)
            take = self._take(nf, self.k)
            for fi in take:
                out_id.append(int(mid))
                out_fi.append(fi)
                out_t.append(fi / float(f) if f else 0.0)
                tensors.append(self.decode_frame(p, fi))
        h, w = self.target_hw
        flat = (
            np.concatenate([t.ravel() for t in tensors])
            if tensors
            else np.empty(0, dtype=np.float32)
        )
        offsets = pa.array(
            np.arange(len(tensors) + 1, dtype=np.int32) * (h * w), pa.int32()
        )
        return pa.table(
            {
                "media_id": pa.array(out_id, pa.int64()),
                "frame_idx": pa.array(out_fi, pa.int64()),
                "t_sec": pa.array(out_t, pa.float64()),
                "pixels": pa.ListArray.from_arrays(
                    offsets, pa.array(flat, pa.float32())
                ),
                "pix_h": pa.array([h] * len(tensors), pa.int32()),
                "pix_w": pa.array([w] * len(tensors), pa.int32()),
            }
        )


def sample_frames(ds, k: int = 4, target_hw=(16, 16), fake: bool = True,
                  concurrency=(1, 8), batch_size: int = 16,
                  on_error: str = "raise"):
    """Video Dataset -> per-sampled-frame Dataset (actor pool, small
    batches: video payloads are the largest media). ``on_error="skip"``
    drops undecodable containers instead of failing the task."""
    return ds.map_batches(
        FrameSampler,
        fn_constructor_args=(k, target_hw, fake, on_error),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def synth_video_table(n: int, payload_kb: int = 16) -> pa.Table:
    rng = np.random.default_rng(43)
    payloads = [
        rng.integers(0, 256, payload_kb * 1024, dtype=np.uint8).tobytes()
        for _ in range(n)
    ]
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "media_type": pa.array(["video/fake"] * n),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array([64] * n, pa.int32()),
            "height": pa.array([48] * n, pa.int32()),
            "n_frames": pa.array(
                rng.integers(1, 240, n).astype(np.int32), pa.int32()
            ),
            "fps": pa.array(np.full(n, 24.0, dtype=np.float32), pa.float32()),
        }
    )


# ---------------- audio: waveform features ----------------

AUDIO_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("media_type", pa.string()),  # "audio/fake", ...
        ("payload", pa.binary()),
        ("sample_rate", pa.int32()),
        ("n_samples", pa.int32()),
    ]
)


class AudioFeatures:
    """Actor-pool audio feature stage: decode (stubbed/fake) to a waveform,
    then vectorized windowed features — per-window RMS + zero-crossing rate
    — as the embedding. Window count fixed so embeddings are fixed-length
    regardless of duration (list<float> ready for the kNN stages)."""

    def __init__(self, n_windows: int = 8, fake: bool = True):
        self.n_windows = n_windows
        self.fake = fake

    def decode_waveform(self, payload: bytes, n_samples: int) -> np.ndarray:
        if not self.fake:
            from ..functions import codecs

            kind = codecs.sniff_media(payload)
            if kind == "audio/wav":
                wav, _rate = codecs.decode_wav(payload)
                return wav
            if kind == "audio/aiff":
                from ..functions.audio import decode_aiff

                return decode_aiff(payload)[0]
            if kind == "audio/basic":
                from ..functions.audio import decode_au

                return decode_au(payload)[0]
            if kind == "audio/flac":
                from ..functions.flac import decode_flac

                pcm, _rate, bits = decode_flac(payload)
                # same mono-mean + full-scale convention as decode_wav,
                # so identical PCM in WAV and FLAC embeds identically
                return (pcm.astype(np.float32).mean(axis=1)
                        / float(1 << (bits - 1)))
            if kind == "audio/ogg":
                from ..functions.audiometa import decode_ogg_flac

                # Ogg-FLAC decodes natively; Opus/Vorbis payloads raise
                # inside decode_ogg_flac's signature check
                pcm, _rate, bits = decode_ogg_flac(payload)
                return (pcm.astype(np.float32).mean(axis=1)
                        / float(1 << (bits - 1)))
            raise NotImplementedError(
                "WAV/AIFF/AU (incl. G.711 ulaw/alaw) and FLAC decode "
                "natively in this environment; use fake=True for other "
                "formats"
            )
        seed = int(hashlib.md5(payload).hexdigest()[:8], 16)
        rng = np.random.default_rng(seed)
        return rng.standard_normal(n_samples).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_numpy()
        payloads = batch.column("payload").to_pylist()
        ns = batch.column("n_samples").to_numpy()
        W = self.n_windows
        feats = np.empty((len(ids), 2 * W), dtype=np.float32)
        for i, (p, n) in enumerate(zip(payloads, ns)):
            wav = self.decode_waveform(p, int(n))
            edges = np.linspace(0, len(wav), W + 1).astype(np.int64)
            for j in range(W):
                seg = wav[edges[j] : edges[j + 1]]
                if len(seg) == 0:
                    feats[i, j] = 0.0
                    feats[i, W + j] = 0.0
                    continue
                feats[i, j] = float(np.sqrt(np.mean(seg * seg)))
                feats[i, W + j] = float(
                    np.mean(np.signbit(seg[1:]) != np.signbit(seg[:-1]))
                ) if len(seg) > 1 else 0.0
        offsets = pa.array(
            np.arange(len(ids) + 1, dtype=np.int32) * (2 * W), pa.int32()
        )
        out = batch.drop_columns(["payload"])
        return out.append_column(
            "embedding",
            pa.ListArray.from_arrays(offsets, pa.array(feats.ravel(), pa.float32())),
        )


class AudioFingerprint(AudioFeatures):
    """64-bit audio fingerprint (Chromaprint-shaped, integer-exact):
    decoded waveform -> int PCM (round(wav * 32768) recovers the container's
    int16 samples exactly for all real decoders) -> 65 equal windows
    (remainder truncated) -> int64 window energies -> 64 gradient-sign bits.
    Pure integer arithmetic after decode, so the signature is bit-stable at
    any parallelism and across containers carrying the same PCM (WAV/AIFF/
    AU must fingerprint identically — tested)."""

    def __init__(self, fake: bool = True):
        super().__init__(n_windows=65, fake=fake)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_numpy()
        payloads = batch.column("payload").to_pylist()
        ns = batch.column("n_samples").to_numpy()
        shifts = np.arange(64, dtype=np.uint64)
        fps = np.zeros(len(ids), dtype=np.uint64)
        for i, (p, n) in enumerate(zip(payloads, ns)):
            wav = self.decode_waveform(p, int(n))
            pcm = np.rint(np.asarray(wav, np.float64) * 32768.0).astype(
                np.int64
            )
            w = self.n_windows
            L = len(pcm) // w
            if L == 0:
                continue
            e = (pcm[: w * L].reshape(w, L) ** 2).sum(axis=1)
            bits = (e[1:] > e[:-1]).astype(np.uint64)
            fps[i] = (bits << shifts).sum(dtype=np.uint64)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "afp": pa.array(fps, pa.uint64()),
            }
        )


def audio_fingerprint_pairs(
    ds,
    max_hamming: int = 4,
    fake: bool = False,
    concurrency=(1, 8),
    batch_size: int = 64,
):
    """Audio near-duplicate pairs: real container decode (actor pool) ->
    64-bit energy-gradient fingerprint -> exact Hamming pairs via
    stages.dedup.hamming_pairs pigeonhole banding. Payload bytes never
    shuffle — only (id, uint64) rows move after decode. Output:
    (doc_a, doc_b, hamming) with doc_a < doc_b, hamming <= max_hamming."""
    from .dedup import hamming_pairs

    sigs = ds.map_batches(
        AudioFingerprint,
        fn_constructor_args=(fake,),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
    return hamming_pairs(sigs, max_hamming, id_col="media_id", sig_col="afp")


def _encode_au_pcm16(pcm: np.ndarray, rate: int = 16000) -> bytes:
    """int16 mono samples -> Sun/NeXT AU bytes (encoding 3 = PCM16 BE)."""
    import struct

    body = np.asarray(pcm).astype(">i2").tobytes()
    return b".snd" + struct.pack(">5I", 24, len(body), 3, rate, 1) + body


def synth_fp_audio_table(n: int = 40, n_samples: int = 4160) -> pa.Table:
    """Real audio fixture with an SQL-expressible integer PCM rule yielding
    designed near-dup groups: clip i in group g = i//4 with perturbation
    d = i%4 has samples
    s(t) = ((g*37 + t*13 + (t*t)%29 + d*100*[t % 331 == 0]) % 401) - 200,
    so group members differ on ~13 of 4160 samples. Even ids encode as
    PCM16 WAV, odd ids as Sun AU — both real decoders sit under one
    oracle (identical PCM -> identical fingerprint)."""
    from ..functions.codecs import encode_wav

    t = np.arange(n_samples, dtype=np.int64)
    payloads, kinds = [], []
    for i in range(n):
        g, d = i // 4, i % 4
        v = ((g * 37 + t * 13 + (t * t) % 29
              + d * 100 * ((t % 331) == 0)) % 401) - 200
        if i % 2 == 0:
            payloads.append(encode_wav(v / 32768.0, 16000))
            kinds.append("audio/wav")
        else:
            payloads.append(_encode_au_pcm16(v.astype(np.int16), 16000))
            kinds.append("audio/basic")
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "media_type": pa.array(kinds),
            "payload": pa.array(payloads, pa.binary()),
            "sample_rate": pa.array([16000] * n, pa.int32()),
            "n_samples": pa.array([n_samples] * n, pa.int32()),
        }
    )


def audio_features(ds, n_windows: int = 8, fake: bool = True,
                   concurrency=(1, 8), batch_size: int = 64):
    return ds.map_batches(
        AudioFeatures,
        fn_constructor_args=(n_windows, fake),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def synth_audio_table(n: int, payload_kb: int = 8) -> pa.Table:
    rng = np.random.default_rng(44)
    payloads = [
        rng.integers(0, 256, payload_kb * 1024, dtype=np.uint8).tobytes()
        for _ in range(n)
    ]
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "media_type": pa.array(["audio/fake"] * n),
            "payload": pa.array(payloads, pa.binary()),
            "sample_rate": pa.array([16000] * n, pa.int32()),
            "n_samples": pa.array(
                rng.integers(8000, 64000, n).astype(np.int32), pa.int32()
            ),
        }
    )


def scene_cut_stats(
    ds,
    k: int = 8,
    target_hw=(16, 16),
    cut_threshold: int = 5120,
    fake: bool = False,
    concurrency=(1, 8),
    batch_size: int = 16,
    on_error: str = "raise",
):
    """Shot/scene-cut detection over REAL decoded frames: sample ``k``
    frames per video (actor-pool decode, sample_frames), then per media
    compute the consecutive-frame sum of absolute luma differences and
    flag cuts where it exceeds ``cut_threshold`` — the classic
    pixel-difference shot-boundary detector (the first stage of any
    video curation pipeline; content-adaptive thresholds layer on top).

    Distributed shape: payload bytes stay in the decode actors; only
    (media_id, frame_idx, pixels) frame rows shuffle ONCE into per-media
    groups (frames-per-video is k, so groups are tiny); diffs are one
    vectorized pass per group. Returns one row per sampled frame:
    (media_id, frame_idx, diff_sum, is_cut) with diff_sum = 0 for each
    media's first sampled frame.
    """
    import pandas as pd

    frames = sample_frames(
        ds, k=k, target_hw=target_hw, fake=fake,
        concurrency=concurrency, batch_size=batch_size, on_error=on_error,
    )

    def per_media(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("frame_idx")
        px = np.stack([
            np.asarray(p, np.int64) for p in g["pixels"]
        ])
        diffs = np.abs(px[1:] - px[:-1]).sum(axis=1)
        diff_sum = np.concatenate([[0], diffs]).astype(np.int64)
        return pd.DataFrame(
            {
                "media_id": g["media_id"].to_numpy(),
                "frame_idx": g["frame_idx"].to_numpy(),
                "diff_sum": diff_sum,
                "is_cut": diff_sum > int(cut_threshold),
            }
        )

    return frames.groupby("media_id").map_groups(
        per_media, batch_format="pandas"
    )


# ---------------- pHash (DCT perceptual hash) ----------------

_PHASH_N = 32  # thumbnail side fed to the DCT


def _dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis matrix (float64): D @ x applies the 1-D
    DCT; the 2-D transform is D @ img @ D.T."""
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    D = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
    D[0] *= np.sqrt(0.5)
    return D


def phash_batch(batch: pa.Table, id_col: str = "media_id") -> pa.Table:
    """64-bit DCT perceptual hash (pHash) per DECODED image: 32x32 luma
    thumbnail -> 2-D DCT-II -> top-left 8x8 low-frequency block -> bit =
    coefficient > median of the 63 AC coefficients (DC excluded, the
    standard pHash convention). More robust than dHash to blur/scale
    because it compares global frequency structure, not adjacent pixels.

    Expects decode with ``target_hw=(32, 32)``. Deterministic: float64
    DCT via two fixed matmuls; bit-stability relies on coefficients not
    sitting within float noise of the median, which holds for any
    natural image (and is asserted by the re-derivation check)."""
    n = batch.num_rows
    if n == 0:
        return pa.table(
            {id_col: pa.array([], pa.int64()),
             "phash": pa.array([], pa.uint64())}
        )
    ph = int(batch.column("pix_h")[0].as_py())
    pw = int(batch.column("pix_w")[0].as_py())
    if (ph, pw) != (_PHASH_N, _PHASH_N):
        raise ValueError(
            f"phash_batch needs ({_PHASH_N}, {_PHASH_N}) thumbnails, "
            f"got {(ph, pw)}"
        )
    px = np.asarray(
        batch.column("pixels").combine_chunks().values, dtype=np.float64
    ).reshape(n, _PHASH_N, _PHASH_N)
    D = _dct_matrix(_PHASH_N)
    co = np.einsum("ij,njk,lk->nil", D, px, D)  # (n, 32, 32) DCT-II
    low = co[:, :8, :8].reshape(n, 64)
    ac = low[:, 1:]  # drop DC
    med = np.median(ac, axis=1, keepdims=True)
    bits = np.zeros((n, 64), np.uint64)
    bits[:, 1:] = (ac > med).astype(np.uint64)
    hashes = (bits << np.arange(64, dtype=np.uint64)[None, :]).sum(
        axis=1, dtype=np.uint64
    )
    return pa.table(
        {
            id_col: batch.column(id_col),
            "phash": pa.array(hashes, pa.uint64()),
        }
    )


def image_phash_pairs(
    ds,
    max_hamming: int = 10,
    fake: bool = False,
    id_col: str = "media_id",
    concurrency=(1, 8),
    batch_size: int = 64,
    on_error: str = "raise",
):
    """Image near-duplicate pairs by DCT pHash + pigeonhole Hamming
    banding — same distributed shape as image_dhash_pairs (payloads stay
    in the decode actors; only (id, uint64) rows shuffle)."""
    from .dedup import hamming_pairs

    dec = decode_images(
        ds, target_hw=(_PHASH_N, _PHASH_N), fake=fake,
        concurrency=concurrency, batch_size=batch_size, on_error=on_error,
    )
    sigs = dec.map_batches(
        phash_batch, batch_format="pyarrow", fn_kwargs={"id_col": id_col}
    )
    return hamming_pairs(sigs, max_hamming, id_col=id_col, sig_col="phash")
