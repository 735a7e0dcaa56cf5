"""MP3/Ogg probes (functions/audiometa.py): a REAL LAME-encoded MP3 on
this host anchors the MPEG frame tables; Ogg fixtures exercise CRC,
lacing continuation and every codec identification path."""

import struct

import pytest

from exactextractr_ray.functions.audiometa import (
    encode_ogg,
    ogg_crc,
    parse_mp3,
    parse_ogg,
)

_REAL_MP3 = (
    "/usr/lib/google-cloud-sdk/platform/gsutil/gslib/tests/test_data/"
    "test.mp3"
)


def test_real_lame_mp3():
    """45 consecutive frames chained by the frame-length formula across
    a real LAME 3.98 file — a wrong bitrate/sample-rate table entry
    would desynchronize the walk."""
    with open(_REAL_MP3, "rb") as f:
        data = f.read()
    info = parse_mp3(data)
    assert info["version"] == 2 and info["layer"] == 3
    assert info["sample_rate"] == 22050 and info["channels"] == 1
    assert info["bitrate"] == 64000
    assert info["n_frames"] == 45
    # 45 frames x 576 samples / 22050 Hz
    assert info["duration_s"] == pytest.approx(45 * 576 / 22050)
    assert info["id3_size"] == 32 and info["vbr"] is False


def test_mp3_hand_built_mpeg1_frame():
    """MPEG-1 Layer III 44.1 kHz 128 kbps stereo: frame length
    144*128000/44100 = 417 (+padding)."""
    hdr = bytes([0xFF, 0xFB, 0x90, 0x00])  # V1 L3, idx9=128k, 44100, pad 0
    frame = hdr + b"\x00" * (417 - 4)
    info = parse_mp3(frame * 3)
    assert info["version"] == 1 and info["layer"] == 3
    assert info["sample_rate"] == 44100 and info["bitrate"] == 128000
    assert info["n_frames"] == 3 and info["channels"] == 2
    assert info["duration_s"] == pytest.approx(3 * 1152 / 44100)


def test_mp3_xing_header_frame_excluded():
    """A first frame carrying a Xing/Info tag is metadata, not audio:
    frame count, duration and mean bitrate must exclude it (matching
    the Xing frame-count convention and common tools)."""
    hdr = bytes([0xFF, 0xFB, 0x90, 0x00])  # MPEG-1 L3 stereo: side info 32
    body = bytearray(b"\x00" * 413)
    body[32:36] = b"Xing"
    xing_frame = hdr + bytes(body)
    audio_frame = hdr + b"\x00" * 413
    info = parse_mp3(xing_frame + audio_frame * 3)
    assert info["vbr"] is True
    assert info["n_frames"] == 3
    assert info["duration_s"] == pytest.approx(3 * 1152 / 44100)
    assert info["bitrate"] == 128000
    # Info tag (CBR) likewise excluded but not flagged VBR
    body[32:36] = b"Info"
    info = parse_mp3(hdr + bytes(body) + audio_frame * 2)
    assert info["vbr"] is False and info["n_frames"] == 2


def test_mp3_resync_after_garbage():
    hdr = bytes([0xFF, 0xFB, 0x90, 0x00])
    frame = hdr + b"\x00" * 413
    data = b"\xff\xf0garbage" + frame * 2
    info = parse_mp3(data)
    assert info["n_frames"] == 2


def test_ogg_crc_is_rfc3533_not_zlib():
    import zlib

    assert ogg_crc(b"") == 0
    assert ogg_crc(b"OggS") != zlib.crc32(b"OggS")

    # independent bit-serial LFSR reference (poly 0x04C11DB7, init 0,
    # unreflected, no augmentation) — RFC 3533 §6's exact convention
    def bitwise(data):
        crc = 0
        for byte in data:
            for i in range(7, -1, -1):
                bit = (byte >> i) & 1
                msb = (crc >> 31) & 1
                crc = (crc << 1) & 0xFFFFFFFF
                if msb ^ bit:
                    crc ^= 0x04C11DB7
        return crc

    for v in (b"\x01", b"OggS", b"hello ogg", bytes(range(64))):
        assert ogg_crc(v) == bitwise(v)


def test_ogg_opus_roundtrip():
    o = encode_ogg(
        [b"\x01" * 100, b"\x02" * 700, b"\x03" * 255],
        codec="opus", sample_rate=48000, channels=2,
        granules=[960, 1920, 2880],
    )
    info = parse_ogg(o)
    assert info["codec"] == "opus"
    assert info["sample_rate"] == 48000 and info["channels"] == 2
    assert info["pre_skip"] == 312
    assert info["duration_s"] == pytest.approx((2880 - 312) / 48000)
    # 700-byte packet needs 255/255/190 lacing; 255-byte one 255/0
    assert info["n_pages"] == 4


def test_ogg_vorbis_roundtrip():
    v = encode_ogg([b"x" * 10], codec="vorbis", sample_rate=44100,
                   channels=1, granules=[88200])
    info = parse_ogg(v)
    assert info["codec"] == "vorbis"
    assert info["sample_rate"] == 44100 and info["channels"] == 1
    assert info["duration_s"] == pytest.approx(2.0)


def test_ogg_crc_validates_pages():
    """Corrupting one body byte must change that page's CRC (re-parse
    still walks — parse is tolerant — but the recomputed CRC differs)."""
    o = bytearray(encode_ogg([b"\x05" * 40], granules=[960]))
    # find the data page (second OggS) and flip a body byte
    second = o.find(b"OggS", 4)
    stored = struct.unpack("<I", o[second + 22:second + 26])[0]
    hdr_len = 27 + o[second + 26]
    body_start = second + hdr_len
    page = bytes(o[second:second + 22]) + b"\x00\x00\x00\x00" + \
        bytes(o[second + 26:body_start + 40])
    assert ogg_crc(page) == stored
    o[body_start] ^= 0xFF
    page_bad = bytes(o[second:second + 22]) + b"\x00\x00\x00\x00" + \
        bytes(o[second + 26:body_start + 40])
    assert ogg_crc(page_bad) != stored


def test_theora_ident():
    # hand-built theora ident packet in a single BOS page
    ident = b"\x80theora" + bytes([3, 2, 1]) + struct.pack(">HH", 40, 30) \
        + b"\x00" * 20
    page = b"OggS" + struct.pack("<BBqIII", 0, 2, 0, 7, 0, 0) \
        + bytes([1, len(ident)]) + ident
    crc = ogg_crc(page)
    page = page[:22] + struct.pack("<I", crc) + page[26:]
    info = parse_ogg(page)
    assert info["codec"] == "theora"
    assert (info["width"], info["height"]) == (640, 480)


def test_sniff_and_probe_integration():
    from exactextractr_ray.functions.codecs import probe_media, sniff_media

    with open(_REAL_MP3, "rb") as f:
        mp3 = f.read()
    assert sniff_media(mp3) == "audio/mpeg"
    pm = probe_media(mp3)
    assert pm["sample_rate"] == 22050 and pm["frames"] == 45

    ogg = encode_ogg([b"\x01" * 10], granules=[960])
    assert sniff_media(ogg) == "audio/ogg"
    pm = probe_media(ogg)
    assert pm["sample_rate"] == 48000 and pm["frames"] == 2


def test_ogg_flac_roundtrip_and_features():
    """FLAC-in-Ogg decodes bit-exactly through packet reassembly onto
    the native decoder; same PCM in bare FLAC and Ogg-FLAC embeds
    identically (cross-container anchor)."""
    import numpy as np

    from exactextractr_ray.functions.audiometa import (
        decode_ogg_flac,
        encode_ogg_flac,
        ogg_packets,
    )
    from exactextractr_ray.functions.flac import encode_flac
    from exactextractr_ray.stages.multimodal import AudioFeatures

    pcm = (1500 * np.sin(np.arange(9000) / 40)).astype(np.int64)
    ogg = encode_ogg_flac(pcm, 22050, block_size=2048)
    info = parse_ogg(ogg)
    assert info["codec"] == "flac" and info["sample_rate"] == 22050
    out, rate, bits = decode_ogg_flac(ogg)
    assert rate == 22050 and bits == 16
    assert np.array_equal(out[:, 0], pcm)
    # multi-page packets reassemble (header packet is > 255 bytes
    # whenever STREAMINFO + fLaC exceed one lacing segment)
    assert len(ogg_packets(ogg)) >= 2

    af = AudioFeatures(fake=False)
    a = af.decode_waveform(encode_flac(pcm, 22050), 0)
    b = af.decode_waveform(ogg, 0)
    assert np.array_equal(a, b)


def test_ogg_opus_payload_raises_in_decode():
    from exactextractr_ray.functions.audiometa import decode_ogg_flac

    o = encode_ogg([b"\x01" * 10], granules=[960])
    with pytest.raises(ValueError, match="Ogg-FLAC"):
        decode_ogg_flac(o)
