"""Matroska/WebM container (functions/webm.py): EBML vints, lacing
modes, unknown-size elements, MJPEG decode, AV1 CodecPrivate
enrichment, probe + FrameSampler integration."""

import struct

import numpy as np
import pytest

from exactextractr_ray.functions.jpeg import encode_jpeg
from exactextractr_ray.functions.webm import (
    _read_vint,
    decode_webm_frames,
    encode_webm,
    extract_webm_frames,
    parse_webm,
)


def _jpegs(n=3, hw=16):
    return [
        encode_jpeg(np.full((hw, hw), 40 * i + 10, np.uint8), quality=95)
        for i in range(n)
    ]


def test_ebml_vint_known_values():
    # RFC 8794 §4: 1-byte 0x81 -> 1; 2-byte 0x4001 -> 1; 0x1A45DFA3 kept
    assert _read_vint(b"\x81", 0, keep_marker=False) == (1, 1)
    assert _read_vint(b"\x40\x01", 0, keep_marker=False) == (1, 2)
    assert _read_vint(b"\x1a\x45\xdf\xa3", 0, keep_marker=True) == (
        0x1A45DFA3, 4,
    )


def test_mjpeg_webm_roundtrip_and_decode():
    jpegs = _jpegs()
    data = encode_webm(jpegs, 16, 16, fps=8.0)
    info = parse_webm(data)
    assert info["doctype"] == "webm"
    assert info["codec"] == "V_MJPEG"
    assert (info["width"], info["height"]) == (16, 16)
    assert info["n_frames"] == 3 and info["fps"] == pytest.approx(8.0)
    assert info["duration_s"] == pytest.approx(0.375)
    assert bool(info["keyframes"].all())
    assert extract_webm_frames(data) == jpegs
    dec, fps = decode_webm_frames(data, indices=[0, 2])
    assert fps == pytest.approx(8.0)
    assert abs(float(dec[0].mean()) - 10) <= 1
    assert abs(float(dec[1].mean()) - 90) <= 1


@pytest.mark.parametrize("mode", ["xiph", "ebml"])
def test_lacing_variable(mode):
    # sizes differ (incl. one > 255 for the Xiph 255-run path)
    payloads = [b"a" * 300, b"b" * 7, b"c" * 90]
    data = encode_webm(payloads, 8, 8, fps=4.0, lacing=mode)
    assert extract_webm_frames(data) == payloads


@pytest.mark.parametrize("mode", ["xiph", "ebml", "fixed"])
def test_lacing_single_frame(mode):
    """A lace with count byte 0 stores NO size fields (every coded size
    except the last frame's is stored; the only frame IS the last), so the
    block remainder is the single frame for every lacing mode."""
    payloads = [b"\x42" * 37]
    data = encode_webm(payloads, 8, 8, lacing=mode)
    assert extract_webm_frames(data) == payloads


def test_lacing_fixed():
    payloads = [bytes([i]) * 25 for i in range(4)]
    data = encode_webm(payloads, 8, 8, lacing="fixed")
    assert extract_webm_frames(data) == payloads


def test_unknown_size_segment_and_cluster():
    """Streamed files leave Segment (and sometimes Cluster) sizes
    unknown (all-ones vint); frames must still be found."""
    payloads = [b"xx" * 4, b"yy" * 6]
    data = bytearray(encode_webm(payloads, 8, 8, fps=2.0))
    # rewrite the Segment size vint (right after the 4-byte Segment ID)
    seg = bytes.fromhex("18538067")
    i = bytes(data).find(seg)
    assert i >= 0
    p = i + 4
    first = data[p]
    width = 8 - first.bit_length() + 1
    val = (1 << (7 * width)) - 1  # all-ones payload = unknown size
    data[p:p + width] = (val | (1 << (7 * width))).to_bytes(width, "big")
    info = parse_webm(bytes(data))
    assert info["n_frames"] == 2
    assert extract_webm_frames(bytes(data)) == payloads


def test_vp9_probe_ok_decode_raises():
    data = encode_webm([b"\x00" * 12], 320, 240, codec_id="V_VP9", fps=30.0)
    info = parse_webm(data)
    assert info["codec"] == "V_VP9"
    assert (info["width"], info["height"]) == (320, 240)
    assert len(extract_webm_frames(data)) == 1  # extraction codec-free
    with pytest.raises(NotImplementedError, match="V_MJPEG"):
        decode_webm_frames(data)


def test_av1_codecprivate_enrichment():
    from tests.test_videometa import _av1c

    data = encode_webm(
        [b"\x12\x00" * 5], 1920, 1080, codec_id="V_AV1",
        codec_private=_av1c(),
    )
    info = parse_webm(data)
    assert info["profile"] == 0 and info["level"] == 8
    assert (info["width"], info["height"]) == (1920, 1080)


def test_sniff_and_probe_media():
    from exactextractr_ray.functions.codecs import probe_media, sniff_media

    data = encode_webm(_jpegs(4), 16, 16, fps=10.0)
    assert sniff_media(data) == "video/webm"
    pm = probe_media(data)
    assert pm == {"kind": "video/webm", "width": 16, "height": 16,
                  "frames": 4, "sample_rate": 10}


def test_frame_sampler_real_for_mjpeg_webm():
    from exactextractr_ray.stages.multimodal import FrameSampler

    jpegs = _jpegs(5)
    data = encode_webm(jpegs, 16, 16, fps=5.0)
    fs = FrameSampler(k=2, target_hw=(16, 16), fake=False)
    idx, fps, tensors = fs._real_frames(data)
    assert len(idx) == 2 and fps == pytest.approx(5.0)
    assert abs(float(tensors[0].mean()) - 10) <= 1


def test_matroska_doctype():
    data = encode_webm(_jpegs(1), 16, 16, doctype="matroska")
    assert parse_webm(data)["doctype"] == "matroska"
