"""HEVC/AV1/VP9 codec-config probes (functions/videometa.py) against
bitstreams hand-assembled bit-by-bit in this test, independent of any
module writer, plus MP4 stsd enrichment."""

import struct

from exactextractr_ray.functions.mp4 import encode_mjpeg_mp4, parse_mp4
from exactextractr_ray.functions.videometa import (
    parse_av1_sequence_header,
    parse_av1c,
    parse_hevc_sps,
    parse_hvcc,
    parse_vpcc,
)


def _ue(v: int) -> str:
    k = v + 1
    n = k.bit_length()
    return "0" * (n - 1) + format(k, f"0{n}b")


def _pack(bits: str) -> bytes:
    bits += "0" * (-len(bits) % 8)
    return int(bits, 2).to_bytes(len(bits) // 8, "big") if bits else b""


def _hevc_sps_1080p() -> bytes:
    """H.265 §7.3.2.2: Main profile L3.1, 1920x1088 with a 4-row
    conformance crop (chroma units x2) -> 1920x1080."""
    bits = (
        "0000"              # sps_video_parameter_set_id
        + "000"             # sps_max_sub_layers_minus1
        + "1"               # temporal_id_nesting
        # profile_tier_level
        + "00" + "0" + "00001"            # space/tier/profile_idc=1 (Main)
        + format(1 << 30, "032b")         # compatibility flags
        + "0" * 48                        # constraint flags
        + format(93, "08b")               # level_idc 3.1
        # (no sub-layers)
        + _ue(0)            # sps_seq_parameter_set_id
        + _ue(1)            # chroma_format_idc 4:2:0
        + _ue(1920)         # pic_width_in_luma_samples
        + _ue(1088)         # pic_height_in_luma_samples
        + "1"               # conformance_window_flag
        + _ue(0) + _ue(0) + _ue(0) + _ue(4)   # crop bottom 4*2 = 8 rows
        + _ue(0) + _ue(0)   # bit depths (8-bit)
        + "1"               # stop bit
    )
    return bytes([33 << 1, 1]) + _pack(bits)


def test_hevc_sps_hand_assembled():
    s = parse_hevc_sps(_hevc_sps_1080p())
    assert (s["width"], s["height"]) == (1920, 1080)
    assert s["profile_idc"] == 1 and s["level_idc"] == 93
    assert s["tier_flag"] == 0 and s["chroma_format_idc"] == 1
    assert s["bit_depth_luma"] == 8


def _hvcc(sps: bytes) -> bytes:
    head = bytearray(22)
    head[0] = 1                      # configurationVersion
    head[1] = 0x01                   # profile_space 0, tier 0, profile 1
    head[12] = 93                    # general_level_idc
    head[13] = 0xF0                  # reserved '1111' + parallelism
    head[14] = 0xFC                  # reserved + chromaFormat
    head[15] = 0xF8                  # reserved + bitDepthLuma
    head[16] = 0xF8                  # reserved + bitDepthChroma
    head[21] = 0x03                  # lengthSizeMinusOne = 3
    arrays = bytes([1])              # numOfArrays
    arrays += bytes([0x20 | 33]) + struct.pack(">H", 1)
    arrays += struct.pack(">H", len(sps)) + sps
    return bytes(head) + arrays


def test_hvcc_record():
    rec = parse_hvcc(_hvcc(_hevc_sps_1080p()))
    assert rec["profile"] == 1 and rec["level"] == 93
    assert rec["nal_length_size"] == 4
    assert (rec["width"], rec["height"]) == (1920, 1080)


def _av1_seq_obu() -> bytes:
    """AV1 §5.5: profile 0, one operating point at level 8 (4.0),
    max frame 1920x1080."""
    body_bits = (
        "000"               # seq_profile
        + "0"               # still_picture
        + "0"               # reduced_still_picture_header
        + "0"               # timing_info_present
        + "0"               # initial_display_delay_present
        + "00000"           # operating_points_cnt_minus_1
        + "0" * 12          # operating_point_idc[0]
        + "01000"           # seq_level_idx[0] = 8
        + "0"               # seq_tier[0] (level > 7)
        + "1011"            # frame_width_bits_minus_1 = 11
        + "1010"            # frame_height_bits_minus_1 = 10
        + format(1919, "012b")
        + format(1079, "011b")
        + "0"               # frame_id_numbers_present
        + "000"             # sb128 / filter_intra / intra_edge_filter
        + "0000"            # interintra/masked/warped/dual_filter
        + "0"               # enable_order_hint
        + "1"               # seq_choose_screen_content_tools
        + "0" * 8           # padding the probe never reads
    )
    body = _pack(body_bits)
    # obu header: type 1, has_size, then leb128 size
    return bytes([0x0A, len(body)]) + body


def test_av1_sequence_header_hand_assembled():
    s = parse_av1_sequence_header(_av1_seq_obu())
    assert (s["width"], s["height"]) == (1920, 1080)
    assert s["seq_profile"] == 0 and s["seq_level_idx"] == 8


def _av1c() -> bytes:
    return bytes([0x81, 0x08, 0x0C, 0x00]) + _av1_seq_obu()


def test_av1c_record():
    rec = parse_av1c(_av1c())
    assert rec["profile"] == 0 and rec["level"] == 8
    assert rec["bit_depth"] == 8 and rec["monochrome"] == 0
    assert (rec["width"], rec["height"]) == (1920, 1080)


def test_vpcc_record():
    body = bytes([1, 0, 0, 0, 0, 31, (8 << 4) | (1 << 1) | 0, 1, 1, 1, 0, 0])
    rec = parse_vpcc(body)
    assert rec["profile"] == 0 and rec["level"] == 31
    assert rec["bit_depth"] == 8 and rec["chroma_subsampling"] == 1


def _box(fourcc: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + fourcc + body


def test_mp4_probe_enrichment_hevc_av1_vp9():
    """stsd child config boxes flow into parse_mp4's probe fields with
    codec-exact dimensions (SPS/sequence-header beat the rounded-up
    sample-entry values)."""
    sample = [b"\x00\x00\x00\x01fake"]
    hevc = encode_mjpeg_mp4(
        sample, 1920, 1088, fps=24.0, codec="hev1",
        sample_entry_extra=_box(b"hvcC", _hvcc(_hevc_sps_1080p())),
    )
    info = parse_mp4(hevc)
    assert info["codec"] == "hev1"
    assert (info["width"], info["height"]) == (1920, 1080)
    assert info["profile"] == 1 and info["level"] == 93

    av1 = encode_mjpeg_mp4(
        sample, 1920, 1080, fps=24.0, codec="av01",
        sample_entry_extra=_box(b"av1C", _av1c()),
    )
    info = parse_mp4(av1)
    assert (info["width"], info["height"]) == (1920, 1080)
    assert info["profile"] == 0 and info["level"] == 8

    vp9 = encode_mjpeg_mp4(
        sample, 640, 360, fps=24.0, codec="vp09",
        sample_entry_extra=_box(
            b"vpcC",
            bytes([1, 0, 0, 0, 0, 31, (8 << 4) | 2, 1, 1, 1, 0, 0]),
        ),
    )
    info = parse_mp4(vp9)
    assert (info["width"], info["height"]) == (640, 360)
    assert info["profile"] == 0 and info["level"] == 31


def test_heif_avif_heic_probe():
    """Item-based HEIF (AVIF/HEIC): meta/pitm/iinf/iprp walk gives the
    primary item's dimensions and codec-config profile/level; sniff
    splits the ftyp brand from track-based MP4."""
    from exactextractr_ray.functions.codecs import probe_media, sniff_media
    from exactextractr_ray.functions.mp4 import (
        encode_heif_probe_fixture,
        parse_mp4,
    )

    avif = encode_heif_probe_fixture(800, 600, "av01", _av1c(),
                                     brand="avif")
    assert sniff_media(avif) == "image/avif"
    info = parse_mp4(avif)
    assert info["codec"] == "av01"
    assert (info["width"], info["height"]) == (800, 600)
    assert info["profile"] == 0 and info["level"] == 8
    pm = probe_media(avif)
    assert pm == {"kind": "image/avif", "width": 800, "height": 600,
                  "frames": 1, "sample_rate": 0}

    heic = encode_heif_probe_fixture(
        1024, 768, "hvc1", _hvcc(_hevc_sps_1080p()), brand="heic"
    )
    assert sniff_media(heic) == "image/heic"
    info = parse_mp4(heic)
    assert info["codec"] == "hvc1"
    assert (info["width"], info["height"]) == (1024, 768)
    assert info["profile"] == 1 and info["level"] == 93

    # no codec config: dimensions still come from ispe
    bare = encode_heif_probe_fixture(64, 48, "av01", brand="avif")
    info = parse_mp4(bare)
    assert (info["width"], info["height"]) == (64, 48)
