"""H.264 structural codec (functions/h264.py): exp-Golomb, emulation
prevention, SPS/PPS parsing against independently hand-assembled
bitstreams, I_PCM round-trips (Annex B + avc1 MP4, incl. fragmented and
multi-slice), probe enrichment, and the honest entropy-coding guard."""

import numpy as np
import pytest

from exactextractr_ray.functions.h264 import (
    _BitReader,
    _BitWriter,
    build_avcc,
    decode_h264,
    ebsp_to_rbsp,
    encode_h264_ipcm,
    h264_stream_info,
    parse_avcc,
    parse_sps,
    rbsp_to_ebsp,
    split_annexb,
)
from exactextractr_ray.functions.mp4 import (
    decode_mp4_frames,
    encode_h264_mp4,
    parse_mp4,
)


def test_exp_golomb_known_codes():
    """§9.1 Table 9-1/9-3 worked values."""
    bw = _BitWriter()
    for v in (0, 1, 2, 3, 6, 7, 254):
        bw.ue(v)
    bw.rbsp_trailing()
    bits = "".join(str(b) for b in bw.bits)
    assert bits.startswith("1" "010" "011" "00100" "00111" "0001000")
    br = _BitReader(bw.finish())
    assert [br.ue() for _ in range(7)] == [0, 1, 2, 3, 6, 7, 254]

    bw = _BitWriter()
    for v in (0, 1, -1, 2, -2, 17, -31):
        bw.se(v)
    bw.rbsp_trailing()
    br = _BitReader(bw.finish())
    assert [br.se() for _ in range(7)] == [0, 1, -1, 2, -2, 17, -31]


def test_emulation_prevention_vectors():
    # §7.4.1.1: 00 00 {00,01,02,03} all need the escape byte
    rbsp = b"\x00\x00\x01\x00\x00\x02\x00\x00\x03\x00\x00\x00"
    ebsp = rbsp_to_ebsp(rbsp)
    assert ebsp == (b"\x00\x00\x03\x01\x00\x00\x03\x02"
                    b"\x00\x00\x03\x03\x00\x00\x03\x00")
    assert ebsp_to_rbsp(ebsp) == rbsp
    # no forbidden 00 00 0x (x<=2) survives in EBSP form (00 00 03 is
    # the escape sequence itself and is the one legal pattern)
    for i in range(len(ebsp) - 2):
        assert not (ebsp[i] == 0 and ebsp[i + 1] == 0 and ebsp[i + 2] <= 2)


def test_sps_parse_hand_assembled():
    """Parse an SPS assembled bit-by-bit in THIS test (independent of
    the module's writer): 1920x1080 high-profile-free baseline with the
    standard crop_bottom=4 (1088 -> 1080)."""
    def ue(v):
        k = v + 1
        n = k.bit_length()
        return "0" * (n - 1) + format(k, f"0{n}b")

    bits = (
        format(66, "08b")       # profile_idc baseline
        + format(0, "08b")      # constraint flags
        + format(40, "08b")     # level 4.0
        + ue(0)                 # sps_id
        + ue(3)                 # log2_max_frame_num_minus4 -> 7
        + ue(0)                 # pic_order_cnt_type 0
        + ue(2)                 # log2_max_pic_order_cnt_lsb_minus4 -> 6
        + ue(3)                 # max_num_ref_frames
        + "0"                   # gaps allowed
        + ue(119)               # pic_width_in_mbs_minus1 -> 120 MBs
        + ue(67)                # pic_height_in_map_units_minus1 -> 68
        + "1"                   # frame_mbs_only
        + "1"                   # direct_8x8
        + "1"                   # frame_cropping
        + ue(0) + ue(0) + ue(0) + ue(4)   # crop bottom 4 units = 8 rows
        + "0"                   # no VUI
        + "1"                   # rbsp stop bit
    )
    bits += "0" * (-len(bits) % 8)
    rbsp = int(bits, 2).to_bytes(len(bits) // 8, "big")
    s = parse_sps(rbsp)
    assert (s["width"], s["height"]) == (1920, 1080)
    assert s["profile_idc"] == 66 and s["level_idc"] == 40
    assert s["log2_max_frame_num"] == 7
    assert s["pic_width_in_mbs"] == 120 and s["pic_height_in_mbs"] == 68


def test_annexb_split_mixed_start_codes():
    n1, n2 = b"\x67\xaa\xbb", b"\x65\x01\x02\x03"
    stream = b"\x00\x00\x00\x01" + n1 + b"\x00\x00\x01" + n2
    assert split_annexb(stream) == [n1, n2]


def test_ipcm_gray_roundtrip_bit_exact():
    rng = np.random.default_rng(42)
    frames = [rng.integers(0, 256, size=(34, 50), dtype=np.uint8)
              for _ in range(3)]
    bs = encode_h264_ipcm(frames, fps=12.5)
    dec, info = decode_h264(bs)
    assert info["width"] == 50 and info["height"] == 34
    assert info["fps"] == pytest.approx(12.5)
    assert info["video_full_range_flag"] == 1
    assert len(dec) == 3
    for src, out in zip(frames, dec):
        # gray -> Cb=Cr=128 -> BT.601 identity on all three channels
        for c in range(3):
            assert np.array_equal(out[..., c], src)


def test_ipcm_emulation_heavy_content():
    """All-zero and stairstep frames maximize 00-byte runs, forcing the
    emulation-prevention path through slice payloads."""
    z = np.zeros((16, 16), np.uint8)
    stair = np.arange(256, dtype=np.uint8).reshape(16, 16) // 64
    bs = encode_h264_ipcm([z, stair], fps=1.0)
    dec, _ = decode_h264(bs)
    assert np.array_equal(dec[0][..., 0], z)
    assert np.array_equal(dec[1][..., 0], stair)


def test_multi_slice_matches_single_slice():
    rng = np.random.default_rng(3)
    f = rng.integers(0, 256, size=(48, 32), dtype=np.uint8)
    one, _ = decode_h264(encode_h264_ipcm([f]))
    many, _ = decode_h264(encode_h264_ipcm([f], mb_rows_per_slice=1))
    assert np.array_equal(one[0], many[0])


def test_avcc_record_roundtrip():
    bs = encode_h264_ipcm([np.zeros((16, 16), np.uint8)], annexb=False)
    rec = parse_avcc(bs["avcc"])
    assert rec["profile"] == 66
    assert rec["nal_length_size"] == 4
    assert rec["sps"] == [bs["sps"]] and rec["pps"] == [bs["pps"]]
    assert build_avcc(bs["sps"], bs["pps"]) == bs["avcc"]


def test_avc1_mp4_probe_and_decode():
    rng = np.random.default_rng(9)
    frames = [rng.integers(0, 256, size=(34, 50), dtype=np.uint8)
              for _ in range(4)]
    data = encode_h264_mp4(frames, fps=10.0)
    info = parse_mp4(data)
    # probe fields come from the SPS: exact cropped dims, profile/level
    assert info["codec"] == "avc1"
    assert (info["width"], info["height"]) == (50, 34)
    assert info["profile"] == 66 and info["level"] == 10
    assert info["n_frames"] == 4
    dec, fps = decode_mp4_frames(data, indices=[1, 3])
    assert fps == pytest.approx(10.0)
    assert np.array_equal(dec[0][..., 0], frames[1])
    assert np.array_equal(dec[1][..., 0], frames[3])


def test_avc1_fragmented_mp4_decode():
    rng = np.random.default_rng(11)
    frames = [rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
              for _ in range(5)]
    data = encode_h264_mp4(frames, fps=5.0, fragment_size=2)
    info = parse_mp4(data)
    assert info["n_frames"] == 5 and info["codec"] == "avc1"
    dec, _ = decode_mp4_frames(data)
    assert all(np.array_equal(d[..., 0], f) for d, f in zip(dec, frames))


def test_rgb_frames_decode_close():
    """RGB path is lossy only through 4:2:0 chroma subsampling; the
    luma-dominant reconstruction stays within a tight bound."""
    rng = np.random.default_rng(5)
    # smooth content: per-MB flat colors (chroma subsample exact there)
    base = rng.integers(0, 256, size=(2, 3, 3), dtype=np.uint8)
    frame = np.repeat(np.repeat(base, 16, axis=0), 16, axis=1)
    dec, _ = decode_h264(encode_h264_ipcm([frame]))
    # flat 16x16 blocks: subsampling exact, only the two float
    # round-trips (RGB->YCbCr->RGB) remain -> off-by-one at most
    assert np.max(np.abs(dec[0].astype(int) - frame.astype(int))) <= 1


def test_entropy_coded_slice_raises_honestly():
    """A slice whose first mb_type is not I_PCM must raise the explicit
    entropy-tables explanation, not mis-decode."""
    from exactextractr_ray.functions.h264 import (
        _write_pps, _write_sps, rbsp_to_ebsp as _esc,
    )
    bw = _BitWriter()
    bw.ue(0)      # first_mb_in_slice
    bw.ue(7)      # slice_type I
    bw.ue(0)      # pps_id
    bw.u(0, 4)    # frame_num
    bw.ue(0)      # idr_pic_id
    bw.u(0, 2)    # dec_ref_pic_marking (IDR)
    bw.se(0)      # slice_qp_delta
    bw.ue(1)      # deblocking off
    bw.ue(0)      # mb_type 0 = I_4x4 -> CAVLC residuals follow
    bw.u(0x5A5A, 16)
    bw.rbsp_trailing()
    stream = (b"\x00\x00\x00\x01" + _write_sps(2, 2, 0, 0, 1.0, 10)
              + b"\x00\x00\x00\x01" + _write_pps()
              + b"\x00\x00\x00\x01" + b"\x65" + _esc(bw.finish()))
    with pytest.raises(NotImplementedError, match="CAVLC"):
        decode_h264(stream)


def test_stream_info_probe_only():
    bs = encode_h264_ipcm([np.zeros((34, 50), np.uint8)], fps=30.0)
    s = h264_stream_info(bs)
    assert (s["width"], s["height"]) == (50, 34)
    assert s["fps"] == pytest.approx(30.0)


def test_odd_dimensions_rejected():
    with pytest.raises(ValueError, match="even"):
        encode_h264_ipcm([np.zeros((17, 16), np.uint8)])


def test_frame_sampler_real_for_ipcm_avc1():
    """FrameSampler(fake=False) is REAL for I_PCM avc1 MP4 payloads."""
    from exactextractr_ray.stages.multimodal import FrameSampler

    rng = np.random.default_rng(21)
    frames = [rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
              for _ in range(6)]
    payload = encode_h264_mp4(frames, fps=6.0)
    fs = FrameSampler(k=3, target_hw=(16, 16), fake=False)
    idx, fps, tensors = fs._real_frames(payload)
    assert idx == [0, 2, 5] or len(idx) == 3
    assert fps == pytest.approx(6.0)
    # gray content: sampled tensors equal the source frames exactly
    for i, t in zip(idx, tensors):
        assert np.array_equal(t.astype(np.uint8), frames[i])
