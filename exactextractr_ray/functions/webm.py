"""Matroska / WebM container codec — pure-struct EBML.

EBML (RFC 8794) and the Matroska element vocabulary are public specs;
WebM is the constrained Matroska profile carrying VP8/VP9/AV1 +
Vorbis/Opus that dominates real web crawls alongside MP4. Like the
ISO-BMFF module (functions/mp4.py) this gives three honest tiers:

1. **probe** (any codec): DocType, codec ID, pixel dimensions, audio
   rate/channels, duration, frame count/fps — straight from the
   Info/Tracks elements. V_AV1 tracks additionally get profile/level
   and sequence-header-exact dimensions from the CodecPrivate av1C
   record (functions/videometa.py).
2. **frame extraction** (any codec): exact per-frame byte ranges +
   keyframe flags + timestamps from Cluster/SimpleBlock walking,
   including all four EBML lacing modes (none / Xiph / fixed / EBML).
3. **frame decode**: REAL for ``V_MJPEG`` tracks (every frame a
   standalone JPEG -> functions/jpeg.py). VP8/VP9/AV1 payload decode
   genuinely needs the codecs' boolean/range arithmetic coders with
   their empirical probability tables and raises.

``encode_webm`` writes a minimal spec-conformant single-track file for
fixtures (and MJPEG reassembly), with optional laced blocks so every
parser path has a real fixture. Unknown-size elements (live-streamed
Segments/Clusters, RFC 8794 §6.2) are handled by sibling-scan
termination.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "parse_webm",
    "extract_webm_frames",
    "decode_webm_frames",
    "encode_webm",
]

# Matroska element IDs (stored form, marker bits included)
_EBML = 0x1A45DFA3
_DOCTYPE = 0x4282
_SEGMENT = 0x18538067
_INFO = 0x1549A966
_TIMECODE_SCALE = 0x2AD7B1
_DURATION = 0x4489
_TRACKS = 0x1654AE6B
_TRACK_ENTRY = 0xAE
_TRACK_NUMBER = 0xD7
_TRACK_TYPE = 0x83
_CODEC_ID = 0x86
_CODEC_PRIVATE = 0x63A2
_DEFAULT_DURATION = 0x23E383
_VIDEO = 0xE0
_PIXEL_WIDTH = 0xB0
_PIXEL_HEIGHT = 0xBA
_AUDIO = 0xE1
_SAMPLING_FREQ = 0xB5
_CHANNELS = 0x9F
_CLUSTER = 0x1F43B675
_CLUSTER_TIMECODE = 0xE7
_SIMPLE_BLOCK = 0xA3
_BLOCK_GROUP = 0xA0
_BLOCK = 0xA1
_REFERENCE_BLOCK = 0xFB

# IDs that terminate an unknown-size Cluster (next sibling or a
# Segment-level element)
_CLUSTER_TERMINATORS = frozenset(
    (_CLUSTER, _INFO, _TRACKS, 0x1C53BB6B, 0x1941A469, 0x1043A770,
     0x114D9B74, _SEGMENT, _EBML)
)


def _read_vint(data: bytes, pos: int, keep_marker: bool) -> tuple[int, int]:
    """EBML variable-length integer (RFC 8794 §4): leading zero count of
    the first byte gives the width; element IDs keep the marker bit,
    sizes strip it."""
    first = data[pos]
    if first == 0:
        raise ValueError("invalid EBML vint (8+ byte width)")
    width = 8 - first.bit_length() + 1
    if pos + width > len(data):
        raise ValueError("truncated EBML vint")
    v = first if keep_marker else first & ((1 << (8 - width)) - 1)
    for i in range(1, width):
        v = (v << 8) | data[pos + i]
    return v, pos + width


def _vint_is_unknown(data: bytes, pos: int) -> bool:
    """True when the size vint at pos is all-ones (unknown size)."""
    first = data[pos]
    width = 8 - first.bit_length() + 1
    v = first & ((1 << (8 - width)) - 1)
    all1 = (1 << (7 * width)) - 1
    for i in range(1, width):
        v = (v << 8) | data[pos + i]
    return v == all1


def _iter_ebml(data: bytes, pos: int, end: int):
    """Yield (element_id, body_start, body_end) over [pos, end).

    Unknown-size elements (RFC 8794 §6.2 — streamed Segments/Clusters)
    terminate at the next sibling/parent boundary: a Segment runs to
    ``end``; a Cluster runs to the next Cluster/level-1 element start
    (best-effort byte-signature scan, validated by a parseable size
    vint at the candidate)."""
    while pos < end:
        try:
            eid, p = _read_vint(data, pos, keep_marker=True)
            unknown = _vint_is_unknown(data, p)
            size, body = _read_vint(data, p, keep_marker=False)
        except (ValueError, IndexError):
            return
        body_end = (
            _unknown_size_end(data, eid, body, end)
            if unknown
            else min(body + size, end)
        )
        yield eid, body, body_end
        pos = body_end


def _unknown_size_end(data: bytes, eid: int, body: int, end: int) -> int:
    if eid != _CLUSTER:
        return end  # Segment (and anything else): runs to range end
    scan = body
    while True:
        best = end
        for sig in (b"\x1fC\xb6u", b"\x15I\xa9f", b"\x16T\xaek",
                    b"\x1cS\xbbk"):  # Cluster/Info/Tracks/Cues
            i = data.find(sig, scan, end)
            if 0 <= i < best:
                best = i
        if best >= end:
            return end
        try:  # validate: a size vint must parse right after the ID
            _read_vint(data, best + 4, keep_marker=False)
            return best
        except (ValueError, IndexError):
            scan = best + 1


def _uint(data: bytes, b: int, e: int) -> int:
    v = 0
    for i in range(b, e):
        v = (v << 8) | data[i]
    return v


def _float(data: bytes, b: int, e: int) -> float:
    n = e - b
    if n == 4:
        return struct.unpack(">f", data[b:e])[0]
    if n == 8:
        return struct.unpack(">d", data[b:e])[0]
    return 0.0


def _parse_block(
    data: bytes, b: int, e: int
) -> tuple[int, int, int, list[tuple[int, int]]]:
    """(Simple)Block payload -> (track_number, rel_timecode, flags,
    [(frame_offset, frame_size), ...]) applying the four lacing modes
    (Matroska spec, Block structure)."""
    track, p = _read_vint(data, b, keep_marker=False)
    (rel,) = struct.unpack(">h", data[p:p + 2])
    flags = data[p + 2]
    p += 3
    lacing = (flags >> 1) & 3
    if lacing == 0:
        return track, rel, flags, [(p, e - p)]
    n_frames = data[p] + 1
    p += 1
    if n_frames == 1:
        # Lace count 0: the spec stores every coded size EXCEPT the last
        # frame's, so a 1-frame lace stores no size fields at all (for any
        # lacing mode) — the whole remainder is the single frame.
        return track, rel, flags, [(p, e - p)]
    sizes: list[int] = []
    if lacing == 2:  # fixed-size
        per = (e - p) // n_frames
        sizes = [per] * n_frames
    elif lacing == 1:  # Xiph
        for _ in range(n_frames - 1):
            s = 0
            while data[p] == 255:
                s += 255
                p += 1
            s += data[p]
            p += 1
            sizes.append(s)
        sizes.append(e - p - sum(sizes))
    else:  # EBML lacing: first absolute, rest signed vint deltas
        first, p = _read_vint(data, p, keep_marker=False)
        sizes.append(first)
        cur = first
        for _ in range(n_frames - 2):
            raw, p2 = _read_vint(data, p, keep_marker=False)
            width = p2 - p
            cur += raw - ((1 << (7 * width - 1)) - 1)  # signed bias
            sizes.append(cur)
            p = p2
        sizes.append(e - p - sum(sizes))
    frames = []
    off = p
    for s in sizes:
        frames.append((off, s))
        off += s
    return track, rel, flags, frames


def parse_webm(data: bytes) -> dict:
    """Matroska/WebM bytes -> {"doctype", "codec", "width", "height",
    "audio_rate", "audio_channels", "duration_s", "n_frames", "fps",
    "frame_offsets", "frame_sizes", "keyframes", "frame_times_ns",
    "codec_private", "profile", "level"} for the first video track
    (audio-only files fill the audio fields)."""
    if data[:4] != bytes.fromhex("1A45DFA3"):
        raise ValueError("not an EBML/Matroska file")
    out: dict = {
        "doctype": "", "codec": "", "width": 0, "height": 0,
        "audio_rate": 0.0, "audio_channels": 0, "duration_s": 0.0,
        "n_frames": 0, "fps": 0.0, "codec_private": b"",
    }
    timecode_scale = 1_000_000  # ns, Matroska default
    duration_ticks = 0.0
    video_track = None
    audio_rate = 0.0
    default_dur_ns = 0
    offs: list[int] = []
    sizes: list[int] = []
    keys: list[bool] = []
    times: list[int] = []

    for eid, b, e in _iter_ebml(data, 0, len(data)):
        if eid == _EBML:
            for cid, cb, ce in _iter_ebml(data, b, e):
                if cid == _DOCTYPE:
                    out["doctype"] = data[cb:ce].split(b"\x00")[0].decode(
                        "ascii", "replace"
                    )
        elif eid == _SEGMENT:
            for sid, sb, se in _iter_ebml(data, b, e):
                if sid == _INFO:
                    for cid, cb, ce in _iter_ebml(data, sb, se):
                        if cid == _TIMECODE_SCALE:
                            timecode_scale = _uint(data, cb, ce)
                        elif cid == _DURATION:
                            duration_ticks = _float(data, cb, ce)
                elif sid == _TRACKS:
                    for tid, tb, te in _iter_ebml(data, sb, se):
                        if tid != _TRACK_ENTRY:
                            continue
                        tr: dict = {"num": 0, "type": 0, "codec": "",
                                    "private": b"", "defdur": 0,
                                    "w": 0, "h": 0, "rate": 0.0, "ch": 0}
                        for cid, cb, ce in _iter_ebml(data, tb, te):
                            if cid == _TRACK_NUMBER:
                                tr["num"] = _uint(data, cb, ce)
                            elif cid == _TRACK_TYPE:
                                tr["type"] = _uint(data, cb, ce)
                            elif cid == _CODEC_ID:
                                tr["codec"] = data[cb:ce].decode(
                                    "ascii", "replace"
                                )
                            elif cid == _CODEC_PRIVATE:
                                tr["private"] = bytes(data[cb:ce])
                            elif cid == _DEFAULT_DURATION:
                                tr["defdur"] = _uint(data, cb, ce)
                            elif cid == _VIDEO:
                                for vid, vb, ve in _iter_ebml(data, cb, ce):
                                    if vid == _PIXEL_WIDTH:
                                        tr["w"] = _uint(data, vb, ve)
                                    elif vid == _PIXEL_HEIGHT:
                                        tr["h"] = _uint(data, vb, ve)
                            elif cid == _AUDIO:
                                for aid, ab, ae in _iter_ebml(data, cb, ce):
                                    if aid == _SAMPLING_FREQ:
                                        tr["rate"] = _float(data, ab, ae)
                                    elif aid == _CHANNELS:
                                        tr["ch"] = _uint(data, ab, ae)
                        if tr["type"] == 1 and video_track is None:
                            video_track = tr
                        elif tr["type"] == 2 and not audio_rate:
                            audio_rate = tr["rate"]
                            out["audio_channels"] = tr["ch"]
                elif sid == _CLUSTER:
                    cluster_tc = 0
                    want = video_track["num"] if video_track else None
                    for cid, cb, ce in _iter_ebml(data, sb, se):
                        if cid == _CLUSTER_TIMECODE:
                            cluster_tc = _uint(data, cb, ce)
                        elif cid in (_SIMPLE_BLOCK, _BLOCK_GROUP):
                            bb, be, ref = cb, ce, False
                            if cid == _BLOCK_GROUP:
                                blk = None
                                for gid, gb, ge in _iter_ebml(data, cb, ce):
                                    if gid == _BLOCK:
                                        blk = (gb, ge)
                                    elif gid == _REFERENCE_BLOCK:
                                        ref = True
                                if blk is None:
                                    continue
                                bb, be = blk
                            track, rel, flags, frames = _parse_block(
                                data, bb, be
                            )
                            if want is not None and track != want:
                                continue
                            key = (bool(flags & 0x80)
                                   if cid == _SIMPLE_BLOCK else not ref)
                            t_ns = (cluster_tc + rel) * timecode_scale
                            for off, sz in frames:
                                offs.append(off)
                                sizes.append(sz)
                                keys.append(key)
                                times.append(t_ns)
    if video_track:
        out.update(
            codec=video_track["codec"], width=video_track["w"],
            height=video_track["h"],
            codec_private=video_track["private"],
        )
        default_dur_ns = video_track["defdur"]
        if video_track["codec"] == "V_AV1" and video_track["private"]:
            from .videometa import parse_av1c

            try:
                rec = parse_av1c(video_track["private"])
                out["profile"] = rec["profile"]
                out["level"] = rec["level"]
                if rec.get("width"):
                    out.update(width=rec["width"], height=rec["height"])
            except (ValueError, IndexError):
                pass
    out["audio_rate"] = float(audio_rate)
    out["duration_s"] = duration_ticks * timecode_scale / 1e9
    out["n_frames"] = len(offs)
    if default_dur_ns:
        out["fps"] = 1e9 / default_dur_ns
    elif out["duration_s"] and offs:
        out["fps"] = len(offs) / out["duration_s"]
    out["frame_offsets"] = np.asarray(offs, np.int64)
    out["frame_sizes"] = np.asarray(sizes, np.int64)
    out["keyframes"] = np.asarray(keys, bool)
    out["frame_times_ns"] = np.asarray(times, np.int64)
    return out


def extract_webm_frames(
    data: bytes, indices: list[int] | None = None
) -> list[bytes]:
    """Coded frame payloads at the given indices (all when None) —
    codec-agnostic byte-range extraction."""
    info = parse_webm(data)
    off, sz = info["frame_offsets"], info["frame_sizes"]
    sel = range(len(off)) if indices is None else indices
    return [bytes(data[off[i]:off[i] + sz[i]]) for i in sel]


def decode_webm_frames(
    data: bytes, indices: list[int] | None = None
) -> tuple[list[np.ndarray], float]:
    """V_MJPEG WebM/Matroska -> (decoded uint8 frames, fps); VP8/VP9/
    AV1 genuinely need the codecs' arithmetic coders and raise."""
    info = parse_webm(data)
    if info["codec"] != "V_MJPEG":
        raise NotImplementedError(
            f"Matroska codec {info['codec']!r} unsupported (V_MJPEG "
            "decodes natively; VP8/VP9/AV1 need the boolean/range "
            "arithmetic coders with empirical probability tables — "
            "absent from this environment; probe + frame extraction "
            "still work)"
        )
    from .jpeg import decode_jpeg

    return [decode_jpeg(p) for p in extract_webm_frames(data, indices)], \
        info["fps"]


# ---------------- fixture muxer ----------------


def _vint_id(eid: int) -> bytes:
    n = (eid.bit_length() + 7) // 8
    return eid.to_bytes(n, "big")


def _vint_size(v: int) -> bytes:
    for width in range(1, 9):
        if v < (1 << (7 * width)) - 1:
            return (v | (1 << (7 * width))).to_bytes(width, "big")
    raise ValueError("size too large")


def _el(eid: int, body: bytes) -> bytes:
    return _vint_id(eid) + _vint_size(len(body)) + body


def _el_uint(eid: int, v: int) -> bytes:
    n = max(1, (v.bit_length() + 7) // 8)
    return _el(eid, v.to_bytes(n, "big"))


def encode_webm(
    frame_payloads: list[bytes],
    width: int,
    height: int,
    fps: float = 24.0,
    codec_id: str = "V_MJPEG",
    codec_private: bytes = b"",
    doctype: str = "webm",
    lacing: str | None = None,
) -> bytes:
    """Coded frame payloads -> minimal single-video-track Matroska/WebM.

    All frames are keyframed SimpleBlocks; ``lacing="xiph"``/"ebml"/
    "fixed" packs ALL frames into one laced block instead so the lacing
    read paths have real fixtures (fixed requires equal sizes)."""
    ms_per_frame = 1000.0 / fps if fps else 0.0
    ebml = _el(_EBML, b"".join((
        _el_uint(0x4286, 1),            # EBMLVersion
        _el_uint(0x42F7, 1),            # EBMLReadVersion
        _el_uint(0x42F2, 4),            # EBMLMaxIDLength
        _el_uint(0x42F3, 8),            # EBMLMaxSizeLength
        _el(_DOCTYPE, doctype.encode()),
        _el_uint(0x4287, 2),            # DocTypeVersion
        _el_uint(0x4285, 2),            # DocTypeReadVersion
    )))
    info = _el(_INFO, b"".join((
        _el_uint(_TIMECODE_SCALE, 1_000_000),
        _el(_DURATION, struct.pack(">d", len(frame_payloads) * ms_per_frame)),
    )))
    video = _el(_VIDEO, _el_uint(_PIXEL_WIDTH, width)
                + _el_uint(_PIXEL_HEIGHT, height))
    entry = b"".join((
        _el_uint(_TRACK_NUMBER, 1),
        _el_uint(0x73C5, 1),            # TrackUID
        _el_uint(_TRACK_TYPE, 1),
        _el(_CODEC_ID, codec_id.encode()),
        _el_uint(_DEFAULT_DURATION, int(round(1e9 / fps)) if fps else 0),
        video,
    ))
    if codec_private:
        entry += _el(_CODEC_PRIVATE, codec_private)
    tracks = _el(_TRACKS, _el(_TRACK_ENTRY, entry))

    def _block_header() -> bytes:
        return bytes([0x81]) + struct.pack(">h", 0)  # track 1, rel tc 0

    clusters = b""
    if lacing:
        n = len(frame_payloads)
        mode = {"xiph": 1, "fixed": 2, "ebml": 3}[lacing]
        track_rel = _block_header()
        flags = 0x80 | (mode << 1)
        lace = bytes([n - 1])
        if mode == 2:
            assert len({len(p) for p in frame_payloads}) == 1
        elif mode == 1:
            for p in frame_payloads[:-1]:
                s = len(p)
                lace += b"\xff" * (s // 255) + bytes([s % 255])
        elif n > 1:
            # EBML lacing stores sizes for all frames but the last; a
            # 1-frame lace therefore stores no size fields at all.
            lace += _vint_size(len(frame_payloads[0]))
            prev = len(frame_payloads[0])
            for p in frame_payloads[1:-1]:
                delta = len(p) - prev
                # signed EBML lacing delta, 2-byte vint bias 0x1FFF
                lace += ((delta + 0x1FFF) | 0x4000).to_bytes(2, "big")
                prev = len(p)
        body = track_rel + bytes([flags]) + lace + b"".join(frame_payloads)
        clusters = _el(_CLUSTER, _el_uint(_CLUSTER_TIMECODE, 0)
                       + _el(_SIMPLE_BLOCK, body))
    else:
        for i, p in enumerate(frame_payloads):
            tc = int(round(i * ms_per_frame))
            body = bytes([0x81]) + struct.pack(">h", 0) + bytes([0x80]) + p
            clusters += _el(_CLUSTER, _el_uint(_CLUSTER_TIMECODE, tc)
                            + _el(_SIMPLE_BLOCK, body))
    segment = _el(_SEGMENT, info + tracks + clusters)
    return ebml + segment
