"""Audio fingerprint near-dup (stages/multimodal.py AudioFingerprint /
audio_fingerprint_pairs): integer window-energy gradient bits over the
REAL WAV/AU decode paths, paired via the generalized Hamming banding.
"""

import numpy as np
import pyarrow as pa

from exactextractr_ray.stages.multimodal import (
    AudioFingerprint,
    _encode_au_pcm16,
    audio_fingerprint_pairs,
    synth_fp_audio_table,
)


def _rule_pcm(i, n=4160):
    g, d = i // 4, i % 4
    t = np.arange(n, dtype=np.int64)
    return ((g * 37 + t * 13 + (t * t) % 29
             + d * 100 * ((t % 331) == 0)) % 401) - 200


def _fp_ref(pcm, w=65):
    L = len(pcm) // w
    e = (pcm[: w * L].reshape(w, L).astype(np.int64) ** 2).sum(axis=1)
    bits = (e[1:] > e[:-1]).astype(np.uint64)
    return int((bits << np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64))


def _brute_pairs(hashes, k):
    out = set()
    for i in range(len(hashes)):
        for j in range(i + 1, len(hashes)):
            hd = bin(hashes[i] ^ hashes[j]).count("1")
            if hd <= k:
                out.add((i, j, hd))
    return out


def _media_batch(payloads, n_samples):
    n = len(payloads)
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "payload": pa.array(payloads, pa.binary()),
            "n_samples": pa.array([n_samples] * n, pa.int32()),
        }
    )


def test_fingerprint_golden_monotone():
    """Strictly growing window energies -> all 64 bits set; constant -> 0."""
    from exactextractr_ray.functions.codecs import encode_wav

    grow = np.repeat(np.arange(1, 66, dtype=np.int64) * 100, 64)
    const = np.full(65 * 64, 123, np.int64)
    batch = _media_batch(
        [encode_wav(grow / 32768.0), encode_wav(const / 32768.0)], 65 * 64
    )
    out = AudioFingerprint(fake=False)(batch)
    assert out.column("afp").to_pylist() == [2**64 - 1, 0]


def test_fingerprint_container_invariance():
    """The SAME PCM in WAV and AU containers fingerprints identically."""
    from exactextractr_ray.functions.codecs import encode_wav

    pcm = _rule_pcm(5)
    batch = _media_batch(
        [encode_wav(pcm / 32768.0), _encode_au_pcm16(pcm.astype(np.int16))],
        len(pcm),
    )
    out = AudioFingerprint(fake=False)(batch).column("afp").to_pylist()
    assert out[0] == out[1] == _fp_ref(pcm)


def test_audio_fp_pairs_real_decode_end_to_end(ray_session):
    """WAV/AU mixed fixture -> fingerprint -> banding matches the numpy
    brute force computed straight from the PCM rule."""
    import ray.data

    got = (
        audio_fingerprint_pairs(
            ray.data.from_arrow(synth_fp_audio_table(40)),
            max_hamming=4, fake=False, batch_size=16,
        )
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
    )
    hashes = [_fp_ref(_rule_pcm(i)) for i in range(40)]
    want = _brute_pairs(hashes, 4)
    got_set = set(zip(got["doc_a"], got["doc_b"], got["hamming"]))
    assert got_set == want
    assert len(want) == 32  # fixture's designed mix (1 exact dup inside)
    assert sum(1 for (_, _, h) in want if h == 0) == 1
