"""MP4 / ISO-BMFF container codec (functions/mp4.py) and its wiring into
sniff/probe dispatch and the real (fake=False) frame-sampling pipeline.

The box grammar is public ISO/IEC 14496-12; with no ffmpeg the evidence is
exact round-trips through this repo's own single-track MJPEG writer
(per-sample byte ranges are bit-exact regardless of codec), cross-checked
frame-for-frame against the MJPEG-AVI container carrying identical pixels.
"""

import numpy as np
import pytest

from exactextractr_ray.functions.jpeg import decode_jpeg, encode_jpeg
from exactextractr_ray.functions.mp4 import (
    decode_mp4_frames,
    encode_mjpeg_mp4,
    extract_mp4_samples,
    parse_mp4,
)


def _jpeg_frames(n=6, h=48, w=64):
    x, y = np.meshgrid(np.linspace(0, 255, w), np.linspace(0, 255, h))
    base = ((x + y) / 2).astype(np.uint8)
    imgs = [
        np.clip(base.astype(int) + 17 * f, 0, 255).astype(np.uint8)
        for f in range(n)
    ]
    return imgs, [
        encode_jpeg(im, quality=95, subsampling="4:4:4") for im in imgs
    ]


def test_mp4_parse_roundtrip():
    imgs, frames = _jpeg_frames()
    payload = encode_mjpeg_mp4(frames, 64, 48, fps=12.0)
    info = parse_mp4(payload)
    assert info["codec"] == "jpeg"
    assert (info["width"], info["height"]) == (64, 48)
    assert info["n_frames"] == 6
    assert info["brand"] == "isom"
    assert abs(info["fps"] - 12.0) < 1e-6
    assert abs(info["duration_s"] - 0.5) < 1e-6
    # stts-derived decode times: frame i at i/fps
    assert np.allclose(info["sample_times"], np.arange(6) / 12.0)


def test_mp4_sample_extraction_bit_exact():
    """stsc/stco/stsz byte ranges recover the exact coded payloads —
    codec-agnostic (works for any MP4, not just MJPEG)."""
    _, frames = _jpeg_frames()
    payload = encode_mjpeg_mp4(frames, 64, 48)
    assert extract_mp4_samples(payload) == frames
    assert extract_mp4_samples(payload, indices=[5, 0]) == [
        frames[5], frames[0]
    ]


def test_mp4_decode_and_subset():
    imgs, frames = _jpeg_frames()
    payload = encode_mjpeg_mp4(frames, 64, 48, fps=12.0)
    dec, fps = decode_mp4_frames(payload, indices=[0, 5])
    assert abs(fps - 12.0) < 1e-6 and len(dec) == 2
    for d, i in zip(dec, (0, 5)):
        assert np.array_equal(d, decode_jpeg(frames[i]))
        assert np.abs(d.astype(int) - imgs[i].astype(int)).max() <= 2


def test_mp4_co64_path():
    """64-bit chunk offsets (co64) parse identically to stco."""
    _, frames = _jpeg_frames(n=3)
    p32 = encode_mjpeg_mp4(frames, 64, 48, co64=False)
    p64 = encode_mjpeg_mp4(frames, 64, 48, co64=True)
    assert extract_mp4_samples(p64) == extract_mp4_samples(p32) == frames


def test_mp4_unsupported_codec_guard():
    """avc1-tagged samples still parse/extract; only decode raises."""
    _, frames = _jpeg_frames(n=2)
    payload = encode_mjpeg_mp4(frames, 64, 48, codec="avc1")
    info = parse_mp4(payload)
    assert info["codec"] == "avc1" and info["n_frames"] == 2
    assert extract_mp4_samples(payload) == frames
    with pytest.raises(NotImplementedError, match="avc1"):
        decode_mp4_frames(payload)


def test_mp4_fragmented_roundtrip():
    """CMAF-shaped fragmented file (moov with empty tables + mvex/trex,
    moof+mdat pairs, default-base-is-moof trun addressing) parses to the
    SAME frames/timing as the progressive layout of identical content."""
    imgs, frames = _jpeg_frames(n=7)
    prog = encode_mjpeg_mp4(frames, 64, 48, fps=12.0)
    frag = encode_mjpeg_mp4(frames, 64, 48, fps=12.0, fragment_size=3)
    info = parse_mp4(frag)
    ref = parse_mp4(prog)
    assert info["codec"] == "jpeg" and info["n_frames"] == 7
    assert (info["width"], info["height"]) == (64, 48)
    assert abs(info["fps"] - ref["fps"]) < 1e-9
    assert abs(info["duration_s"] - ref["duration_s"]) < 1e-9
    assert np.allclose(info["sample_times"], ref["sample_times"])
    # trex default flags = sync: every sample is a keyframe
    assert np.array_equal(info["sync"], np.arange(7))
    assert extract_mp4_samples(frag) == frames
    dec, fps = decode_mp4_frames(frag, indices=[0, 6])
    assert abs(fps - 12.0) < 1e-6
    for d, i in zip(dec, (0, 6)):
        assert np.array_equal(d, decode_jpeg(frames[i]))


def test_mp4_fragmented_probe():
    from exactextractr_ray.functions.codecs import probe_media, sniff_media

    _, frames = _jpeg_frames(n=5)
    frag = encode_mjpeg_mp4(frames, 64, 48, fps=10.0, fragment_size=2)
    assert sniff_media(frag) == "video/mp4"
    p = probe_media(frag)
    assert p == {"kind": "video/mp4", "width": 64, "height": 48,
                 "frames": 5, "sample_rate": 10}


def test_mp4_fragmented_and_non_mp4_rejected():
    import struct

    frag = (
        struct.pack(">I", 16) + b"ftyp" + b"cmfc" + b"\x00" * 4
        + struct.pack(">I", 8) + b"moof"
    )
    with pytest.raises(NotImplementedError, match="fragmented"):
        parse_mp4(frag)
    with pytest.raises(ValueError):
        parse_mp4(b"\x00" * 32)


def test_mp4_sniff_and_probe():
    from exactextractr_ray.functions.codecs import probe_media, sniff_media

    _, frames = _jpeg_frames(n=4)
    payload = encode_mjpeg_mp4(frames, 64, 48, fps=8.0)
    assert sniff_media(payload) == "video/mp4"
    p = probe_media(payload)
    assert p == {"kind": "video/mp4", "width": 64, "height": 48,
                 "frames": 4, "sample_rate": 8}
    # fragmented MP4: probe never raises, returns zeros
    import struct

    frag = (
        struct.pack(">I", 16) + b"ftyp" + b"cmfc" + b"\x00" * 4
        + struct.pack(">I", 8) + b"moof"
    )
    assert probe_media(frag)["kind"] == "video/mp4"
    assert probe_media(frag)["frames"] == 0


def test_sample_frames_real_mp4_matches_avi(ray_session):
    """FrameSampler fake=False over MJPEG MP4, cross-checked against the
    AVI container carrying the identical pixel content: the sampled
    tensors must agree bit-for-bit (same JPEG payloads, two containers)."""
    import ray.data

    from exactextractr_ray.stages.multimodal import (
        sample_frames,
        synth_mjpeg_avi_table,
        synth_mjpeg_mp4_table,
    )

    t_mp4 = synth_mjpeg_mp4_table(4, hw=(32, 48), n_frames=6, fps=12.0)
    t_avi = synth_mjpeg_avi_table(4, hw=(32, 48), n_frames=6, fps=12.0)

    def run(tbl):
        return (
            sample_frames(
                ray.data.from_arrow(tbl), k=3, target_hw=(8, 8),
                fake=False, batch_size=2,
            )
            .to_pandas()
            .sort_values(["media_id", "frame_idx"])
            .reset_index(drop=True)
        )

    out_mp4, out_avi = run(t_mp4), run(t_avi)
    assert len(out_mp4) == 12  # 3 frames x 4 videos
    assert (out_mp4["frame_idx"] == out_avi["frame_idx"]).all()
    assert np.allclose(out_mp4["t_sec"], out_avi["t_sec"])
    for a, b in zip(out_mp4["pixels"], out_avi["pixels"]):
        assert np.array_equal(np.asarray(a), np.asarray(b))
