"""FLAC codec (functions/flac.py): bit-exact lossless round-trips over
every subframe/residual/stereo mode, CRCs against independent
bit-serial references, the coded-number scheme against CPython's own
UTF-8 encoder, and the WAV cross-container identity anchor."""

import io
import wave

import numpy as np
import pytest

from exactextractr_ray.functions.flac import (
    _BitsW,
    _write_coded_number,
    crc8,
    crc16,
    decode_flac,
    encode_flac,
    flac_info,
)


def _smooth(n=6000):
    return (2000 * np.sin(np.arange(n) / 37.0)).astype(np.int64)


def test_crc8_crc16_vs_bitserial():
    def bitser(data, poly, width):
        crc = 0
        top = 1 << (width - 1)
        mask = (1 << width) - 1
        for byte in data:
            for i in range(7, -1, -1):
                bit = (byte >> i) & 1
                msb = (crc & top) != 0
                crc = (crc << 1) & mask
                if msb ^ bit:
                    crc ^= poly
        return crc

    for v in (b"", b"\x01", b"fLaC", bytes(range(100))):
        assert crc8(v) == bitser(v, 0x07, 8)
        assert crc16(v) == bitser(v, 0x8005, 16)


def test_coded_number_matches_cpython_utf8():
    """The FLAC coded-number scheme coincides with UTF-8 for values in
    the real Unicode range — CPython's encoder is the independent
    reference there."""
    for v in (0, 1, 0x7F, 0x80, 0x7FF, 0x800, 0xFFFF, 0x10000, 0x10FFFF):
        if 0xD800 <= v <= 0xDFFF:
            continue
        bw = _BitsW()
        _write_coded_number(bw, v)
        assert bw.bytes() == chr(v).encode("utf-8"), hex(v)


@pytest.mark.parametrize("kind", ["smooth", "noisy", "const", "zeros"])
def test_mono_roundtrip_bit_exact(kind):
    rng = np.random.default_rng(11)
    pcm = {
        "smooth": _smooth(),
        "noisy": rng.integers(-32768, 32768, 5000),
        "const": np.full(4000, -123),
        "zeros": np.zeros(3000, np.int64),
    }[kind]
    data = encode_flac(pcm, 44100, block_size=1024)
    out, rate, bits = decode_flac(data)
    assert rate == 44100 and bits == 16
    assert np.array_equal(out[:, 0], pcm)


@pytest.mark.parametrize("mid_side", [False, True])
def test_stereo_roundtrip(mid_side):
    s = _smooth()
    st = np.stack([s, (s * 0.7).astype(np.int64) - 5], axis=1)
    data = encode_flac(st, 48000, block_size=777, mid_side=mid_side)
    out, rate, _ = decode_flac(data)
    assert rate == 48000
    assert np.array_equal(out, st)


def test_lpc_path():
    s = _smooth()
    data = encode_flac(s, lpc=([3, -3, 1], 1), block_size=512)
    out, _, _ = decode_flac(data)
    assert np.array_equal(out[:, 0], s)


@pytest.mark.parametrize("porder,rice2", [(2, False), (4, False),
                                          (0, True), (3, True)])
def test_partitioned_rice_and_rice2(porder, rice2):
    s = _smooth(8192)
    data = encode_flac(s, block_size=2048, partition_order=porder,
                       rice2=rice2)
    out, _, _ = decode_flac(data)
    assert np.array_equal(out[:, 0], s)


def test_wasted_bits_path():
    s = (_smooth() >> 3) << 5  # 5 common low zero bits
    data = encode_flac(s, block_size=900)
    out, _, _ = decode_flac(data)
    assert np.array_equal(out[:, 0], s)


def test_escape_partition_path():
    rng = np.random.default_rng(7)
    # extreme-amplitude noise makes raw cheaper than any Rice parameter
    s = rng.integers(-32768, 32768, 600)
    data = encode_flac(s, block_size=600)
    out, _, _ = decode_flac(data)
    assert np.array_equal(out[:, 0], s)


def test_ragged_final_block_and_frame_numbers():
    s = _smooth(10_000)  # 3 blocks: 4096 + 4096 + 1808
    data = encode_flac(s, block_size=4096)
    out, _, _ = decode_flac(data)
    assert np.array_equal(out[:, 0], s)


def test_crc_corruption_detected():
    data = bytearray(encode_flac(_smooth(1000), block_size=1000))
    info = flac_info(bytes(data))
    data[info["frames_at"] + 30] ^= 0x55  # flip a subframe byte
    # corruption surfaces as a CRC mismatch or (when the flipped bits
    # desync the Rice stream first) a truncation error — never silence
    with pytest.raises(ValueError, match="CRC|truncated"):
        decode_flac(bytes(data))


def test_streaminfo_and_probe():
    from exactextractr_ray.functions.codecs import probe_media, sniff_media

    data = encode_flac(_smooth(5000), sample_rate=22050)
    assert sniff_media(data) == "audio/flac"
    info = flac_info(data)
    assert info["sample_rate"] == 22050 and info["channels"] == 1
    assert info["bits"] == 16 and info["total_samples"] == 5000
    pm = probe_media(data)
    assert pm["sample_rate"] == 22050 and pm["frames"] == 5000


def test_wav_flac_cross_container_identity():
    """The same PCM in WAV (trusted stdlib anchor) and FLAC must embed
    identically through AudioFeatures(fake=False)."""
    from exactextractr_ray.stages.multimodal import AudioFeatures

    pcm = _smooth(4800)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(16000)
        f.writeframes(pcm.astype("<i2").tobytes())
    wav_bytes = buf.getvalue()
    flac_bytes = encode_flac(pcm, 16000)
    af = AudioFeatures(fake=False)
    a = af.decode_waveform(wav_bytes, 0)
    b = af.decode_waveform(flac_bytes, 0)
    assert np.array_equal(a, b)


def test_vorbis_comment_tags():
    from exactextractr_ray.functions.flac import flac_tags

    pcm = _smooth(2000)
    d = encode_flac(pcm, 16000,
                    tags={"TITLE": "wavefront", "artist": "ray-zonal"})
    t = flac_tags(d)
    assert t["tags"] == {"TITLE": "wavefront", "ARTIST": "ray-zonal"}
    # tagged stream still decodes bit-exactly; STREAMINFO unaffected
    out, rate, _ = decode_flac(d)
    assert rate == 16000 and np.array_equal(out[:, 0], pcm)
    assert flac_info(d)["total_samples"] == 2000
    assert flac_tags(encode_flac(pcm, 16000))["tags"] == {}
