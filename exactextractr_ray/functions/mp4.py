"""MP4 / ISO Base Media File Format container codec — pure struct.

The box (atom) structure is public ISO/IEC 14496-12: a ``moov`` movie box
holds per-track sample TABLES (``stts`` timing, ``stsc``/``stco``/``stsz``
chunk layout, ``stss`` sync samples) that map every sample to a byte range
in ``mdat``. Parsing those tables needs no codec work at all, which gives
three honest capability tiers:

1. **probe** (any MP4/QuickTime, any codec): width/height/frame-count/fps
   straight from ``tkhd``/``stsd``/``mdhd``/``stts`` — the header-only
   pre-filter pass (functions/codecs.py probe_media).
2. **sample extraction** (any codec): exact per-frame byte ranges, so a
   pipeline can ship individual coded frames downstream without decoding.
3. **frame decode**: REAL for Motion-JPEG-in-MP4 (sample entry ``jpeg`` /
   ``mjpa``, every sample a standalone JPEG -> functions/jpeg.py) and for
   ``avc1``/``avc3`` whose samples are I_PCM-coded (functions/h264.py —
   the spec's raw-sample macroblocks, bit-exact). Entropy-coded AVC /
   HEVC / MPEG-4 Visual genuinely need native codecs and raise; their
   ``avcC`` SPS still yields exact dimensions/profile/level/fps for the
   probe tier.

``encode_mjpeg_mp4`` writes a minimal spec-conformant single-track file
(ftyp + mdat + moov) for fixtures and sampled-frame reassembly.

Fragmented MP4 (``moof`` movie fragments — the CMAF/DASH segment layout
common in web crawls) keeps its sample tables in per-fragment ``trun``
boxes: parse_mp4 walks every fragment, applying trex/tfhd defaults and
the base-data-offset / default-base-is-moof addressing rules (§8.8), so
probe/extract/decode work identically for progressive and fragmented
files. Only a moov-less bare segment (initialization segment elsewhere)
raises, since the codec config genuinely isn't in the file.
"""

from __future__ import annotations

import struct

import numpy as np

_VIDEO_CODECS_DECODABLE = ("jpeg", "mjpa")


def _iter_boxes(data: bytes, pos: int, end: int):
    """Yield (fourcc str, body_start, body_end) for each box in [pos, end).

    Handles 64-bit ``largesize`` (size==1) and to-end-of-file (size==0)
    encodings; stops cleanly on truncation."""
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", data[pos:pos + 4])
        fourcc = data[pos + 4:pos + 8].decode("ascii", "replace")
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                return
            (size,) = struct.unpack(">Q", data[pos + 8:pos + 16])
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < 8 or pos + size > end:
            return
        yield fourcc, body, pos + size
        pos += size


def _child(data: bytes, pos: int, end: int, fourcc: str):
    for fc, b, e in _iter_boxes(data, pos, end):
        if fc == fourcc:
            return b, e
    return None


def _parse_stbl(data: bytes, pos: int, end: int) -> dict:
    """Sample-table box -> codec fourcc, dims, per-sample (offset, size),
    sync-sample indices (0-based), per-sample decode deltas."""
    out: dict = {
        "codec": "", "width": 0, "height": 0, "avcc": None,
        "sizes": None, "uniform_size": 0, "chunk_offsets": [],
        "stsc": [], "sync": None, "deltas": [],
    }
    for fc, b, e in _iter_boxes(data, pos, end):
        if fc == "stsd":
            (n,) = struct.unpack(">I", data[b + 4:b + 8])
            if n >= 1 and b + 16 <= e:
                out["codec"] = data[b + 12:b + 16].decode("ascii", "replace")
                # VisualSampleEntry: 8B SampleEntry + 16B pre_defined/
                # reserved, then width/height uint16 (14496-12 §12.1.3)
                if b + 44 <= e:
                    w, h = struct.unpack(">HH", data[b + 40:b + 44])
                    out["width"], out["height"] = w, h
                # codec-config child boxes follow the 86-byte fixed
                # VisualSampleEntry (14496-15 §5.3.4: avcC for avc1/avc3,
                # hvcC for hev1/hvc1, av1C for av01, vpcC for vp09)
                (entry_size,) = struct.unpack(">I", data[b + 8:b + 12])
                for cfc, cb, ce in _iter_boxes(
                    data, b + 8 + 86, min(b + 8 + entry_size, e)
                ):
                    if cfc in ("avcC", "hvcC", "av1C", "vpcC"):
                        out[cfc.lower()] = bytes(data[cb:ce])
        elif fc == "stts":
            (n,) = struct.unpack(">I", data[b + 4:b + 8])
            raw = np.frombuffer(data[b + 8:b + 8 + 8 * n], dtype=">u4")
            out["deltas"] = raw.reshape(-1, 2).astype(np.int64)
        elif fc == "stss":
            (n,) = struct.unpack(">I", data[b + 4:b + 8])
            nums = np.frombuffer(data[b + 8:b + 8 + 4 * n], dtype=">u4")
            out["sync"] = nums.astype(np.int64) - 1  # spec is 1-based
        elif fc == "stsc":
            (n,) = struct.unpack(">I", data[b + 4:b + 8])
            raw = np.frombuffer(data[b + 8:b + 8 + 12 * n], dtype=">u4")
            out["stsc"] = raw.reshape(-1, 3).astype(np.int64)
        elif fc == "stsz":
            uniform, n = struct.unpack(">II", data[b + 4:b + 12])
            if uniform:
                out["uniform_size"] = int(uniform)
                out["n_samples"] = int(n)
            else:
                out["sizes"] = np.frombuffer(
                    data[b + 12:b + 12 + 4 * n], dtype=">u4"
                ).astype(np.int64)
        elif fc == "stco":
            (n,) = struct.unpack(">I", data[b + 4:b + 8])
            out["chunk_offsets"] = np.frombuffer(
                data[b + 8:b + 8 + 4 * n], dtype=">u4"
            ).astype(np.int64)
        elif fc == "co64":
            (n,) = struct.unpack(">I", data[b + 4:b + 8])
            out["chunk_offsets"] = np.frombuffer(
                data[b + 8:b + 8 + 8 * n], dtype=">u8"
            ).astype(np.int64)
    return out


def _sample_ranges(stbl: dict) -> tuple[np.ndarray, np.ndarray]:
    """(offsets, sizes) int64 arrays, one entry per sample, from the
    stsc/stco/stsz trio (14496-12 §8.7): stsc runs give samples-per-chunk
    for chunk ranges; within a chunk samples are contiguous."""
    sizes = stbl["sizes"]
    if sizes is None:
        sizes = np.full(
            stbl.get("n_samples", 0), stbl["uniform_size"], np.int64
        )
    chunk_off = np.asarray(stbl["chunk_offsets"], np.int64)
    n_chunks = len(chunk_off)
    stsc = stbl["stsc"]
    per_chunk = np.zeros(n_chunks, np.int64)
    for i, (first, spc, _sdi) in enumerate(stsc):
        last = stsc[i + 1][0] - 1 if i + 1 < len(stsc) else n_chunks
        per_chunk[int(first) - 1:int(last)] = int(spc)
    if per_chunk.sum() != len(sizes):
        # tolerate trailing mismatch (truncated files): clamp to stsz count
        per_chunk = np.minimum(
            per_chunk, np.maximum(len(sizes) - np.r_[0, per_chunk].cumsum()[:-1], 0)
        )
    offsets = np.empty(len(sizes), np.int64)
    k = 0
    for c in range(n_chunks):
        cnt = int(per_chunk[c])
        if cnt == 0:
            continue
        sz = sizes[k:k + cnt]
        offsets[k:k + cnt] = chunk_off[c] + np.r_[0, sz[:-1]].cumsum()
        k += cnt
    return offsets[:k], sizes[:k]


def _parse_trex(data: bytes, mb: int, me: int, track_id: int) -> dict:
    """Movie-extends defaults for one track (trex, §8.8.3): the fallback
    sample duration/size/flags every fragment inherits."""
    mvex = _child(data, mb, me, "mvex")
    if mvex is None:
        return {}
    for fc, b, e in _iter_boxes(data, mvex[0], mvex[1]):
        if fc != "trex":
            continue
        tid, _sdi, dur, size, flags = struct.unpack(
            ">5I", data[b + 4:b + 24]
        )
        if tid == track_id:
            return {"dur": int(dur), "size": int(size), "flags": int(flags)}
    return {}


def _parse_fragments(data: bytes, track_id: int, trex: dict):
    """All moof fragments for one track -> per-sample (offsets, sizes,
    durations, is_sync). Implements the §8.8.7/8.8.8 tfhd/trun rules:
    base-data-offset-present (0x1) else default-base-is-moof / first-byte-
    of-moof addressing; per-sample fields fall back to tfhd then trex
    defaults; sample_flags bit 16 = non-sync."""
    offsets: list[int] = []
    sizes: list[int] = []
    durs: list[int] = []
    sync: list[bool] = []
    for fc, b, e in _iter_boxes(data, 0, len(data)):
        if fc != "moof":
            continue
        moof_start = b - 8
        for tfc, tb, te in _iter_boxes(data, b, e):
            if tfc != "traf":
                continue
            tfhd = _child(data, tb, te, "tfhd")
            if tfhd is None:
                continue
            flags = int.from_bytes(data[tfhd[0] + 1:tfhd[0] + 4], "big")
            pos = tfhd[0] + 4
            (tid,) = struct.unpack(">I", data[pos:pos + 4])
            pos += 4
            if tid != track_id:
                continue
            base = moof_start
            if flags & 0x1:
                (base,) = struct.unpack(">Q", data[pos:pos + 8])
                pos += 8
            if flags & 0x2:  # sample-description-index
                pos += 4
            d_dur = trex.get("dur", 0)
            d_size = trex.get("size", 0)
            d_flags = trex.get("flags", 0)
            if flags & 0x8:
                (d_dur,) = struct.unpack(">I", data[pos:pos + 4])
                pos += 4
            if flags & 0x10:
                (d_size,) = struct.unpack(">I", data[pos:pos + 4])
                pos += 4
            if flags & 0x20:
                (d_flags,) = struct.unpack(">I", data[pos:pos + 4])
                pos += 4
            cursor: int | None = None
            for rfc, rb, _re in _iter_boxes(data, tb, te):
                if rfc != "trun":
                    continue
                tflags = int.from_bytes(data[rb + 1:rb + 4], "big")
                (cnt,) = struct.unpack(">I", data[rb + 4:rb + 8])
                p = rb + 8
                if tflags & 0x1:
                    (doff,) = struct.unpack(">i", data[p:p + 4])
                    p += 4
                    cursor = base + doff
                elif cursor is None:
                    cursor = base
                first_flags = None
                if tflags & 0x4:
                    (first_flags,) = struct.unpack(">I", data[p:p + 4])
                    p += 4
                for i in range(cnt):
                    dur, sz, sf = d_dur, d_size, d_flags
                    if tflags & 0x100:
                        (dur,) = struct.unpack(">I", data[p:p + 4])
                        p += 4
                    if tflags & 0x200:
                        (sz,) = struct.unpack(">I", data[p:p + 4])
                        p += 4
                    if tflags & 0x400:
                        (sf,) = struct.unpack(">I", data[p:p + 4])
                        p += 4
                    elif i == 0 and first_flags is not None:
                        sf = first_flags
                    if tflags & 0x800:  # composition time offset
                        p += 4
                    offsets.append(cursor)
                    sizes.append(int(sz))
                    durs.append(int(dur))
                    sync.append(not (sf & 0x00010000))
                    cursor += int(sz)
    return (
        np.asarray(offsets, np.int64), np.asarray(sizes, np.int64),
        np.asarray(durs, np.int64), np.asarray(sync, bool),
    )


def parse_mp4(data: bytes) -> dict:
    """MP4/QuickTime bytes -> {"codec", "width", "height", "n_frames",
    "fps", "duration_s", "sample_offsets", "sample_sizes", "sync",
    "sample_times", "audio_rate", "brand"}.

    Parses the ``moov`` sample tables of the FIRST video (``vide``) track;
    when the moov tables are empty and ``moof`` fragments exist (CMAF/
    DASH), the per-fragment trun tables are walked instead. When no video
    track exists, audio_rate/n_frames come from the first ``soun`` track
    (M4A probe support). Codec payloads are NOT touched."""
    ftyp = _child(data, 0, len(data), "ftyp")
    brand = data[ftyp[0]:ftyp[0] + 4].decode("ascii", "replace") if ftyp else ""
    moov = _child(data, 0, len(data), "moov")
    if moov is None:
        if _child(data, 0, len(data), "meta") is not None:
            # item-based HEIF family (AVIF/HEIC stills): no tracks at all
            return parse_heif(data, brand)
        if _child(data, 0, len(data), "moof") is not None:
            raise NotImplementedError(
                "bare fragmented-MP4 segment: the moov initialization "
                "segment (codec config + trex defaults) is in a separate "
                "file — concatenate init + media segments to parse"
            )
        raise ValueError("not an MP4: no moov box")
    mb, me = moov
    out = {
        "codec": "", "width": 0, "height": 0, "n_frames": 0, "fps": 0.0,
        "duration_s": 0.0, "sample_offsets": np.empty(0, np.int64),
        "sample_sizes": np.empty(0, np.int64),
        "sync": None, "sample_times": np.empty(0, np.float64),
        "audio_rate": 0, "brand": brand,
    }
    picked_video = False
    for fc, tb, te in _iter_boxes(data, mb, me):
        if fc != "trak" or picked_video:
            continue
        mdia = _child(data, tb, te, "mdia")
        if mdia is None:
            continue
        hdlr = _child(data, mdia[0], mdia[1], "hdlr")
        kind = data[hdlr[0] + 8:hdlr[0] + 12] if hdlr else b""
        mdhd = _child(data, mdia[0], mdia[1], "mdhd")
        timescale = duration = 0
        if mdhd:
            ver = data[mdhd[0]]
            if ver == 1:
                timescale, duration = struct.unpack(
                    ">IQ", data[mdhd[0] + 20:mdhd[0] + 32]
                )
            else:
                timescale, duration = struct.unpack(
                    ">II", data[mdhd[0] + 12:mdhd[0] + 20]
                )
        if kind == b"soun" and not out["audio_rate"]:
            out["audio_rate"] = int(timescale)
            if not out["n_frames"]:
                out["n_frames"] = int(duration)
            continue
        if kind != b"vide":
            continue
        minf = _child(data, mdia[0], mdia[1], "minf")
        stbl_box = minf and _child(data, minf[0], minf[1], "stbl")
        if not stbl_box:
            continue
        tkhd = _child(data, tb, te, "tkhd")
        track_id = 0
        if tkhd:
            off = 20 if data[tkhd[0]] == 1 else 12
            (track_id,) = struct.unpack(
                ">I", data[tkhd[0] + off:tkhd[0] + off + 4]
            )
        stbl = _parse_stbl(data, stbl_box[0], stbl_box[1])
        offsets, sizes = _sample_ranges(stbl)
        n = len(offsets)
        dur_s = duration / timescale if timescale else 0.0
        deltas = stbl["deltas"]
        times = np.zeros(n, np.float64)
        if len(deltas) and timescale:
            flat = np.repeat(deltas[:, 1], deltas[:, 0])[:n]
            times[1:] = np.cumsum(flat)[: n - 1] / timescale
        sync = stbl["sync"]
        if n == 0:
            # empty moov tables: fragmented file — walk moof/trun tables
            trex = _parse_trex(data, mb, me, track_id)
            offsets, sizes, fdurs, fsync = _parse_fragments(
                data, track_id, trex
            )
            n = len(offsets)
            if n:
                sync = np.flatnonzero(fsync)
                times = np.zeros(n, np.float64)
                if timescale:
                    times[1:] = np.cumsum(fdurs)[: n - 1] / timescale
                    dur_s = float(fdurs.sum()) / timescale
        out.update(
            codec=stbl["codec"], width=int(stbl["width"]),
            height=int(stbl["height"]), n_frames=n,
            fps=(n / dur_s) if dur_s else 0.0, duration_s=dur_s,
            sample_offsets=offsets, sample_sizes=sizes,
            sync=sync, sample_times=times, avcc=stbl["avcc"],
        )
        if stbl["avcc"]:
            # enrich from the in-band SPS: exact cropped dimensions,
            # profile/level, and the VUI frame rate when signalled
            from .h264 import ebsp_to_rbsp, parse_avcc, parse_sps

            try:
                rec = parse_avcc(stbl["avcc"])
                sps = parse_sps(ebsp_to_rbsp(rec["sps"][0][1:]))
                out.update(
                    width=sps["width"], height=sps["height"],
                    profile=sps["profile_idc"], level=sps["level_idc"],
                    nal_length_size=rec["nal_length_size"],
                )
                if sps["fps"]:
                    out["fps"] = sps["fps"]
            except (ValueError, IndexError):
                pass  # malformed avcC: keep the stsd/tkhd dimensions
        elif stbl.get("hvcc") or stbl.get("av1c") or stbl.get("vpcc"):
            # HEVC / AV1 / VP9 probe enrichment (functions/videometa.py)
            from . import videometa as _vm

            try:
                if stbl.get("hvcc"):
                    rec = _vm.parse_hvcc(stbl["hvcc"])
                elif stbl.get("av1c"):
                    rec = _vm.parse_av1c(stbl["av1c"])
                else:
                    rec = _vm.parse_vpcc(stbl["vpcc"])
                out["profile"] = rec["profile"]
                out["level"] = rec.get("level", rec.get("seq_level_idx", 0))
                if rec.get("width"):
                    out.update(width=rec["width"], height=rec["height"])
                if rec.get("nal_length_size"):
                    out["nal_length_size"] = rec["nal_length_size"]
            except (ValueError, IndexError, struct.error):
                pass  # malformed config record: keep stsd dimensions
        picked_video = True
    return out


def extract_mp4_samples(
    data: bytes, indices: list[int] | None = None
) -> list[bytes]:
    """Coded frame payloads at the given sample indices (all when None) —
    codec-agnostic byte-range extraction from mdat."""
    info = parse_mp4(data)
    off, sz = info["sample_offsets"], info["sample_sizes"]
    sel = range(len(off)) if indices is None else indices
    return [bytes(data[off[i]:off[i] + sz[i]]) for i in sel]


def decode_mp4_frames(
    data: bytes, indices: list[int] | None = None
) -> tuple[list[np.ndarray], float]:
    """Motion-JPEG MP4 -> (decoded uint8 frames at the given indices, fps).

    Every ``jpeg``/``mjpa`` sample is a standalone JPEG stream (QuickTime
    File Format spec, Motion-JPEG sample description). ``avc1``/``avc3``
    decodes through functions/h264.py when the samples are I_PCM-coded
    (the spec's raw-sample macroblocks — see that module's docstring for
    why entropy-coded residuals stay unsupported); other codecs raise."""
    info = parse_mp4(data)
    if info["codec"] in ("avc1", "avc3") and info["avcc"]:
        from .h264 import decode_h264, parse_avcc

        rec = parse_avcc(info["avcc"])
        payloads = extract_mp4_samples(data, indices)
        frames = []
        for p in payloads:
            fr, _ = decode_h264(
                p, nal_length_size=rec["nal_length_size"],
                sps_nals=rec["sps"], pps_nals=rec["pps"],
            )
            frames.extend(fr)
        return frames, info["fps"]
    if info["codec"] not in _VIDEO_CODECS_DECODABLE:
        raise NotImplementedError(
            f"MP4 video codec {info['codec']!r} unsupported (Motion-JPEG "
            "'jpeg'/'mjpa' decodes natively, 'avc1' I_PCM through "
            "functions/h264.py; entropy-coded AVC / hev1 / mp4v need "
            "native codecs absent from this environment)"
        )
    from .jpeg import decode_jpeg

    payloads = extract_mp4_samples(data, indices)
    return [decode_jpeg(p) for p in payloads], info["fps"]


def _box(fourcc: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + fourcc + body


def _full(fourcc: bytes, body: bytes, version: int = 0) -> bytes:
    return _box(fourcc, struct.pack(">I", version << 24) + body)


def _visual_sample_entry(
    codec: str, width: int, height: int, extra: bytes = b""
) -> bytes:
    return (
        struct.pack(">I", 86 + len(extra))
        + codec.encode("ascii")
        + b"\x00" * 6 + struct.pack(">H", 1)   # SampleEntry
        + b"\x00" * 16                          # pre_defined / reserved
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + struct.pack(">I", 0) + struct.pack(">H", 1)  # reserved, frame_count
        + b"\x00" * 32                          # compressorname
        + struct.pack(">Hh", 24, -1)            # depth, pre_defined
        + extra                                  # codec config (e.g. avcC)
    )


def _encode_fragmented(
    jpeg_frames: list[bytes],
    width: int,
    height: int,
    codec: str,
    timescale: int,
    delta: int,
    fragment_size: int,
    sample_entry_extra: bytes = b"",
) -> bytes:
    """CMAF-shaped fragmented MP4: ftyp + moov (EMPTY sample tables +
    mvex/trex defaults) followed by one moof+mdat pair per ``fragment_size``
    samples. trun uses default-base-is-moof addressing (tfhd flag 0x020000,
    data_offset from the first byte of moof) with per-sample sizes and the
    duration inherited from trex — the layout §8.8 readers must handle."""
    stsd = _full(b"stsd", struct.pack(">I", 1)
                 + _visual_sample_entry(codec, width, height,
                                        sample_entry_extra))
    stts = _full(b"stts", struct.pack(">I", 0))
    stsc = _full(b"stsc", struct.pack(">I", 0))
    stsz = _full(b"stsz", struct.pack(">II", 0, 0))
    stco = _full(b"stco", struct.pack(">I", 0))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    vmhd = (struct.pack(">I", 20) + b"vmhd" + struct.pack(">I", 1)
            + struct.pack(">HHHH", 0, 0, 0, 0))
    url_ = struct.pack(">I", 12) + b"url " + struct.pack(">I", 1)
    dinf = _box(b"dinf", _full(b"dref", struct.pack(">I", 1) + url_))
    minf = _box(b"minf", vmhd + dinf + stbl)
    hdlr = _full(b"hdlr", struct.pack(">I", 0) + b"vide" + b"\x00" * 12
                 + b"VideoHandler\x00")
    # duration 0 = unknown (lives in the fragments)
    mdhd = _full(b"mdhd", struct.pack(">IIIIHH", 0, 0, timescale, 0,
                                      0x55C4, 0))
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    matrix = struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
    tkhd_body = (
        struct.pack(">IIIII", 0, 0, 1, 0, 0)
        + b"\x00" * 8
        + struct.pack(">hhhh", 0, 0, 0, 0)
        + matrix
        + struct.pack(">II", width << 16, height << 16)
    )
    tkhd = struct.pack(">I", 12 + len(tkhd_body)) + b"tkhd" \
        + struct.pack(">I", 7) + tkhd_body
    trak = _box(b"trak", tkhd + mdia)
    # trex: track 1, sdi 1, default duration = delta, size 0, flags 0 (sync)
    mvex = _box(b"mvex",
                _full(b"trex", struct.pack(">5I", 1, 1, delta, 0, 0)))
    mvhd = _full(
        b"mvhd",
        struct.pack(">IIII", 0, 0, timescale, 0)
        + struct.pack(">IH", 0x00010000, 0x0100) + b"\x00" * 10
        + matrix + b"\x00" * 24 + struct.pack(">I", 2),
    )
    moov = _box(b"moov", mvhd + trak + mvex)
    ftyp = _box(b"ftyp", b"iso5" + struct.pack(">I", 0x200) + b"iso5iso6mp41")

    parts = [ftyp, moov]
    for seq, i in enumerate(range(0, len(jpeg_frames), fragment_size), 1):
        chunk = jpeg_frames[i:i + fragment_size]
        cnt = len(chunk)
        mfhd = _full(b"mfhd", struct.pack(">I", seq))
        # tfhd: default-base-is-moof only (0x020000), track 1
        tfhd = _box(b"tfhd", struct.pack(">II", 0x020000, 1))
        # trun flags 0x201: data-offset + per-sample size
        # moof = 8 + mfhd(16) + traf(8 + tfhd(16) + trun(20 + 4*cnt))
        moof_len = 68 + 4 * cnt
        trun = _box(
            b"trun",
            struct.pack(">IIi", 0x201, cnt, moof_len + 8)
            + b"".join(struct.pack(">I", len(f)) for f in chunk),
        )
        moof = _box(b"moof", mfhd + _box(b"traf", tfhd + trun))
        assert len(moof) == moof_len
        parts.append(moof)
        parts.append(_box(b"mdat", b"".join(chunk)))
    return b"".join(parts)


def encode_mjpeg_mp4(
    jpeg_frames: list[bytes],
    width: int,
    height: int,
    fps: float = 24.0,
    codec: str = "jpeg",
    co64: bool = False,
    fragment_size: int | None = None,
    sample_entry_extra: bytes = b"",
) -> bytes:
    """JPEG frame payloads -> minimal single-track MP4 (ftyp+mdat+moov).

    ``codec`` overrides the stsd fourcc (fixtures exercising the
    unsupported-codec guard pass e.g. 'avc1'); ``co64`` forces 64-bit
    chunk offsets so the co64 read path has a real fixture.
    ``fragment_size=k`` writes a FRAGMENTED file instead (CMAF shape:
    ftyp + moov with empty sample tables + mvex/trex, then one
    moof+mdat pair per k samples with default-base-is-moof trun
    addressing) so the §8.8 fragment reader has real fixtures."""
    n = len(jpeg_frames)
    timescale = 90000
    delta = int(round(timescale / fps)) if fps else timescale
    duration = n * delta

    if fragment_size:
        return _encode_fragmented(
            jpeg_frames, width, height, codec, timescale, delta,
            fragment_size, sample_entry_extra,
        )

    mdat_body = b"".join(jpeg_frames)
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2mp41")
    mdat = _box(b"mdat", mdat_body)
    base = len(ftyp) + len(mdat) - len(mdat_body)  # offset of first sample

    sizes = [len(f) for f in jpeg_frames]
    offs: list[int] = []
    pos = base
    for s in sizes:
        offs.append(pos)
        pos += s

    stsd = _full(b"stsd", struct.pack(">I", 1)
                 + _visual_sample_entry(codec, width, height,
                                        sample_entry_extra))
    stts = _full(b"stts", struct.pack(">III", 1, n, delta))
    stsc = _full(b"stsc", struct.pack(">IIII", 1, 1, n, 1))  # one chunk
    stsz = _full(
        b"stsz",
        struct.pack(">II", 0, n) + b"".join(struct.pack(">I", s) for s in sizes),
    )
    if co64:
        stco = _full(b"co64", struct.pack(">IQ", 1, offs[0]) if n else
                     struct.pack(">I", 0))
    else:
        stco = _full(b"stco", struct.pack(">II", 1, offs[0]) if n else
                     struct.pack(">I", 0))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    # vmhd flags must be 1 per spec (§12.1.2)
    vmhd = (struct.pack(">I", 20) + b"vmhd" + struct.pack(">I", 1)
            + struct.pack(">HHHH", 0, 0, 0, 0))
    # url  box with flag 1 = media is self-contained
    url_ = struct.pack(">I", 12) + b"url " + struct.pack(">I", 1)
    dref = _full(b"dref", struct.pack(">I", 1) + url_)
    dinf = _box(b"dinf", dref)
    minf = _box(b"minf", vmhd + dinf + stbl)
    hdlr = _full(b"hdlr", struct.pack(">I", 0) + b"vide" + b"\x00" * 12
                 + b"VideoHandler\x00")
    mdhd = _full(b"mdhd", struct.pack(">IIIIHH", 0, 0, timescale, duration,
                                      0x55C4, 0))
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    matrix = struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
    tkhd_body = (
        struct.pack(">IIIII", 0, 0, 1, 0, duration)
        + b"\x00" * 8
        + struct.pack(">hhhh", 0, 0, 0, 0)
        + matrix
        + struct.pack(">II", width << 16, height << 16)
    )
    tkhd = struct.pack(">I", 12 + len(tkhd_body)) + b"tkhd" \
        + struct.pack(">I", 7) + tkhd_body  # flags: enabled|in_movie|preview
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _full(
        b"mvhd",
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">IH", 0x00010000, 0x0100) + b"\x00" * 10
        + matrix + b"\x00" * 24 + struct.pack(">I", 2),
    )
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def encode_h264_mp4(
    frames: list[np.ndarray],
    fps: float = 24.0,
    *,
    mb_rows_per_slice: int | None = None,
    fragment_size: int | None = None,
) -> bytes:
    """Frames (uint8 gray (h, w) or RGB (h, w, 3)) -> an ``avc1`` MP4
    whose samples are Baseline I_PCM IDR pictures (functions/h264.py):
    a genuinely standard H.264 file any conformant player decodes, and
    the one AVC coding mode decodable offline. SPS/PPS ship out-of-band
    in the avcC record per 14496-15; samples are 4-byte length-prefixed
    NAL units. Grayscale content round-trips bit-exactly."""
    from .h264 import encode_h264_ipcm

    enc = encode_h264_ipcm(
        frames, fps, mb_rows_per_slice=mb_rows_per_slice, annexb=False
    )
    h, w = frames[0].shape[:2]
    return encode_mjpeg_mp4(
        enc["samples"], w, h, fps=fps, codec="avc1",
        fragment_size=fragment_size,
        sample_entry_extra=_box(b"avcC", enc["avcc"]),
    )


def parse_heif(data: bytes, brand: str = "") -> dict:
    """Item-based HEIF still images (ISO 23008-12: AVIF/HEIC) -> the
    parse_mp4 probe dict. The ``meta`` FullBox carries pitm (primary
    item), iinf/infe (item codec type), and iprp: ipco holds the
    property boxes (ispe spatial extents, av1C/hvcC codec config), ipma
    associates them to items. Dimensions/profile come from the PRIMARY
    item's properties; payload decode is the AV1/HEVC entropy coder and
    stays out of scope (probe + extraction tier only)."""
    meta = _child(data, 0, len(data), "meta")
    if meta is None:
        raise ValueError("HEIF: no meta box")
    mb, me = meta[0] + 4, meta[1]  # meta is a FullBox: skip version/flags
    out = {
        "codec": "", "width": 0, "height": 0, "n_frames": 1, "fps": 0.0,
        "duration_s": 0.0, "sample_offsets": np.empty(0, np.int64),
        "sample_sizes": np.empty(0, np.int64), "sync": None,
        "sample_times": np.empty(0, np.float64), "audio_rate": 0,
        "brand": brand, "avcc": None, "heif": True,
    }
    primary = None
    item_types: dict[int, str] = {}
    props: list[tuple[str, int, int]] = []
    assoc: dict[int, list[int]] = {}
    for fc, b, e in _iter_boxes(data, mb, me):
        if fc == "pitm":
            ver = data[b]
            primary = (struct.unpack(">H", data[b + 4:b + 6])[0]
                       if ver == 0 else
                       struct.unpack(">I", data[b + 4:b + 8])[0])
        elif fc == "iinf":
            ver = data[b]
            n_off = b + 4
            cnt = (struct.unpack(">H", data[n_off:n_off + 2])[0]
                   if ver == 0 else
                   struct.unpack(">I", data[n_off:n_off + 4])[0])
            p = n_off + (2 if ver == 0 else 4)
            for ifc, ib, ie in _iter_boxes(data, p, e):
                if ifc != "infe":
                    continue
                iver = data[ib]
                if iver >= 2:
                    iid = (struct.unpack(">H", data[ib + 4:ib + 6])[0]
                           if iver == 2 else
                           struct.unpack(">I", data[ib + 4:ib + 8])[0])
                    toff = ib + (8 if iver == 2 else 10)
                    item_types[iid] = data[toff:toff + 4].decode(
                        "ascii", "replace"
                    )
        elif fc == "iprp":
            for pfc, pb, pe in _iter_boxes(data, b, e):
                if pfc == "ipco":
                    for cfc, cb, ce in _iter_boxes(data, pb, pe):
                        props.append((cfc, cb, ce))
                elif pfc == "ipma":
                    ver = data[pb]
                    flags = data[pb + 3]
                    (cnt,) = struct.unpack(">I", data[pb + 4:pb + 8])
                    p = pb + 8
                    for _ in range(cnt):
                        if ver == 0:
                            (iid,) = struct.unpack(">H", data[p:p + 2])
                            p += 2
                        else:
                            (iid,) = struct.unpack(">I", data[p:p + 4])
                            p += 4
                        an = data[p]
                        p += 1
                        idxs = []
                        for _a in range(an):
                            if flags & 1:
                                (v,) = struct.unpack(">H", data[p:p + 2])
                                idxs.append(v & 0x7FFF)
                                p += 2
                            else:
                                idxs.append(data[p] & 0x7F)
                                p += 1
                        assoc[iid] = idxs
    if primary is None and item_types:
        primary = sorted(item_types)[0]
    out["codec"] = item_types.get(primary, "")
    want = assoc.get(primary)
    chosen = (
        [props[i - 1] for i in want if 0 < i <= len(props)]
        if want else props
    )
    for pfc, pb, pe in chosen:
        if pfc == "ispe":
            w, h = struct.unpack(">II", data[pb + 4:pb + 12])
            out["width"], out["height"] = int(w), int(h)
        elif pfc == "av1C":
            from .videometa import parse_av1c

            try:
                rec = parse_av1c(data[pb:pe])
                out["profile"] = rec["profile"]
                out["level"] = rec["level"]
            except (ValueError, IndexError):
                pass
        elif pfc == "hvcC":
            from .videometa import parse_hvcc

            try:
                rec = parse_hvcc(data[pb:pe])
                out["profile"] = rec["profile"]
                out["level"] = rec["level"]
            except (ValueError, IndexError, struct.error):
                pass
    return out


def encode_heif_probe_fixture(
    width: int, height: int, codec: str = "av01",
    config: bytes | None = None, brand: str = "avif",
) -> bytes:
    """Minimal item-based HEIF for PROBE-tier fixtures: ftyp + meta
    (pitm/iinf/iprp with ispe + optional codec config + ipma) + a stub
    mdat. The payload is NOT a decodable AV1/HEVC stream (that needs
    the native entropy coders); dimension/codec probing is the real
    surface under test."""
    ftyp = _box(b"ftyp", brand.encode("ascii") + struct.pack(">I", 0)
                + b"mif1miaf")
    hdlr = _full(b"hdlr", struct.pack(">I", 0) + b"pict" + b"\x00" * 12
                 + b"\x00")
    pitm = _full(b"pitm", struct.pack(">H", 1))
    infe = _full(b"infe", struct.pack(">HH", 1, 0)
                 + codec.encode("ascii") + b"img\x00", version=2)
    iinf = _full(b"iinf", struct.pack(">H", 1) + infe)
    ispe = _full(b"ispe", struct.pack(">II", width, height))
    ipco_children = ispe
    n_props = 1
    if config is not None:
        cfg_fourcc = b"av1C" if codec == "av01" else b"hvcC"
        ipco_children += _box(cfg_fourcc, config)
        n_props = 2
    ipco = _box(b"ipco", ipco_children)
    ipma_entries = (struct.pack(">H", 1) + bytes([n_props])
                    + bytes(range(1, n_props + 1)))
    ipma = _full(b"ipma", struct.pack(">I", 1) + ipma_entries)
    iprp = _box(b"iprp", ipco + ipma)
    meta = _full(b"meta", hdlr + pitm + iinf + iprp)
    mdat = _box(b"mdat", b"\x00" * 16)
    return ftyp + meta + mdat
