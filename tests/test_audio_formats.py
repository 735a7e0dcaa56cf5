"""AIFF/AU decoders + G.711 companding, cross-validated against WAV.

CPython's test suite ships the SAME recording ("pluck") in WAV, AIFF and
AU at 8/16/24/32-bit plus ulaw/alaw — the already-trusted WAV decoder
anchors every other container and encoding. The fixtures were converted
independently (LSB-level dither differences between containers), so
PCM comparisons use a 4-LSB tolerance and G.711 the companding error
bound; correlation must be ~1 everywhere.
"""

import os

import numpy as np
import pytest

D = "/root/.pyenv/versions/3.11.7/lib/python3.11/test/audiodata/"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(D), reason="CPython audio fixtures not present"
)


def _wav16():
    from exactextractr_ray.functions.codecs import decode_wav

    return decode_wav(open(D + "pluck-pcm16.wav", "rb").read())


def test_aiff_pcm16_matches_wav():
    from exactextractr_ray.functions.audio import decode_aiff

    wav, rw = _wav16()
    aif, ra = decode_aiff(open(D + "pluck-pcm16.aiff", "rb").read())
    assert ra == rw == 11025
    assert len(aif) == len(wav)
    assert np.abs(aif - wav).max() <= 4 / 32768.0
    assert np.corrcoef(aif, wav)[0, 1] > 0.99999


def test_au_pcm16_matches_wav():
    from exactextractr_ray.functions.audio import decode_au

    wav, rw = _wav16()
    au, ru = decode_au(open(D + "pluck-pcm16.au", "rb").read())
    assert ru == rw
    assert np.abs(au - wav).max() <= 4 / 32768.0


@pytest.mark.parametrize("bits", [8, 24, 32])
@pytest.mark.parametrize("ext", ["aiff", "au"])
def test_pcm_depths(bits, ext):
    from exactextractr_ray.functions.audio import decode_aiff, decode_au

    dec = decode_aiff if ext == "aiff" else decode_au
    wav, _ = _wav16()
    w, r = dec(open(D + f"pluck-pcm{bits}.{ext}", "rb").read())
    assert r == 11025 and len(w) == len(wav)
    tol = 0.01 if bits == 8 else 4 / 32768.0
    assert np.abs(w - wav).max() <= tol
    assert np.corrcoef(w, wav)[0, 1] > 0.9999


@pytest.mark.parametrize("name,dec", [
    ("pluck-ulaw.au", "au"),
    ("pluck-alaw.au", "au"),
    ("pluck-ulaw.aifc", "aiff"),
    ("pluck-alaw.aifc", "aiff"),
])
def test_g711_companding(name, dec):
    from exactextractr_ray.functions.audio import decode_aiff, decode_au

    if not os.path.exists(D + name):
        pytest.skip(name)
    fn = decode_au if dec == "au" else decode_aiff
    wav, _ = _wav16()
    w, r = fn(open(D + name, "rb").read())
    assert r == 11025
    # G.711 segment quantization error bound (~38 dB SNR)
    assert np.abs(w - wav).max() < 0.05
    assert np.corrcoef(w, wav)[0, 1] > 0.9999


def test_g711_tables_roundtrip_properties():
    from exactextractr_ray.functions.audio import _ALAW, _ULAW

    # mu-law: code 0xFF is zero, full negative range covered, odd symmetry
    assert _ULAW[0xFF] == 0
    assert _ULAW.min() == -32124 and _ULAW.max() == 32124
    # A-law max magnitude is 32256 (G.711 table 2), symmetric
    assert _ALAW.min() == -32256 and _ALAW.max() == 32256
    assert len(np.unique(_ULAW)) == 255  # +0 and -0 collapse
    assert len(np.unique(_ALAW)) == 256


def test_sniff_and_audio_features_dispatch():
    from exactextractr_ray.functions.codecs import sniff_media
    from exactextractr_ray.stages.multimodal import AudioFeatures

    aiff = open(D + "pluck-pcm16.aiff", "rb").read()
    au = open(D + "pluck-ulaw.au", "rb").read()
    assert sniff_media(aiff) == "audio/aiff"
    assert sniff_media(au) == "audio/basic"
    af = AudioFeatures(fake=False)
    wav_direct, _ = _wav16()
    w = af.decode_waveform(aiff, 0)
    assert len(w) == len(wav_direct)
    w2 = af.decode_waveform(au, 0)
    assert len(w2) == len(wav_direct)
    with pytest.raises(NotImplementedError):
        af.decode_waveform(b"\x00" * 32, 0)


def test_bad_headers_raise():
    from exactextractr_ray.functions.audio import decode_aiff, decode_au

    with pytest.raises(ValueError):
        decode_aiff(b"FORMxxxxWAVE" + b"\x00" * 8)
    with pytest.raises(ValueError):
        decode_au(b"RIFF" + b"\x00" * 20)
