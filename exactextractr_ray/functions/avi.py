"""Motion-JPEG AVI (RIFF) container codec — pure struct + the from-spec
JPEG codec in functions/jpeg.py.

The AVI RIFF layout is public Microsoft documentation (the 'AVI ' form:
``hdrl`` with ``avih``/``strh``/``strf``, a ``movi`` LIST whose ``00dc``
chunks each hold one compressed frame, optional ``idx1``). With MJPG as
the codec every frame chunk is a standalone baseline JPEG, so a real
video decode path needs no ffmpeg: parse the container, pick frames,
``decode_jpeg`` each. This is what makes the video frame-sampling stage
(stages/multimodal.py FrameSampler fake=False) REAL for MJPEG AVIs.

``encode_mjpeg_avi`` writes a minimal spec-conformant single-stream file
(fixtures + sink for sampled-frame reassembly).
"""

from __future__ import annotations

import struct

import numpy as np


def parse_avi(data: bytes) -> dict:
    """AVI bytes -> {"frames": [jpeg bytes, ...], "fps": float,
    "width": int, "height": int, "handler": fourcc str}.

    Tolerant chunk walk: unknown chunks are skipped; frames are the video
    stream's ``##dc``/``##db`` chunks in file order."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI: missing RIFF/AVI header")
    width = height = 0
    rate = scale = 0
    handler = ""
    frames: list[bytes] = []
    vids_stream: int | None = None
    stream_no = -1

    def walk(pos: int, end: int):
        nonlocal width, height, rate, scale, handler, vids_stream, stream_no
        while pos + 8 <= end:
            cid = data[pos:pos + 4]
            (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
            body_start = pos + 8
            body_end = min(body_start + size, end)
            if cid in (b"RIFF", b"LIST"):
                walk(body_start + 4, body_end)  # skip the form/list type
            elif cid == b"avih":
                us_pf, _, _, _, _total, _, _, _, w, h = struct.unpack(
                    "<10I", data[body_start:body_start + 40]
                )
                width, height = w, h
                if not rate and us_pf:
                    rate, scale = 1_000_000, us_pf
            elif cid == b"strh":
                stream_no += 1
                fcc_type = data[body_start:body_start + 4]
                if fcc_type == b"vids" and vids_stream is None:
                    vids_stream = stream_no
                    handler = data[body_start + 4:body_start + 8].decode(
                        "ascii", "replace"
                    )
                    sc, rt = struct.unpack(
                        "<II", data[body_start + 20:body_start + 28]
                    )
                    if rt and sc:
                        rate, scale = rt, sc
            elif (
                len(cid) == 4
                and cid[:2].isdigit()
                and cid[2:] in (b"dc", b"db")
            ):
                if vids_stream is None or int(cid[:2]) == vids_stream:
                    frames.append(data[body_start:body_end])
            pos = body_start + size + (size & 1)  # chunks are word-aligned

    walk(12, min(8 + struct.unpack("<I", data[4:8])[0], len(data)))
    fps = (rate / scale) if (rate and scale) else 0.0
    return {
        "frames": frames,
        "fps": fps,
        "width": width,
        "height": height,
        "handler": handler,
    }


def decode_avi_frames(
    data: bytes, indices: list[int] | None = None
) -> tuple[list[np.ndarray], float]:
    """MJPEG AVI -> (decoded uint8 frames at the given indices — all
    frames when None, fps)."""
    info = parse_avi(data)
    if info["handler"] not in ("MJPG", "mjpg", "dmb1", ""):
        raise NotImplementedError(
            f"AVI codec {info['handler']!r} unsupported (MJPG only; no "
            "native codecs in this environment)"
        )
    from .jpeg import decode_jpeg

    frames = info["frames"]
    sel = range(len(frames)) if indices is None else indices
    return [decode_jpeg(frames[i]) for i in sel], info["fps"]


def _chunk(cid: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return cid + struct.pack("<I", len(body)) + body + pad


def _list(ltype: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", ltype + body)


def encode_mjpeg_avi(
    jpeg_frames: list[bytes], width: int, height: int, fps: float = 24.0
) -> bytes:
    """JPEG frame payloads -> minimal single-stream MJPEG AVI with idx1."""
    n = len(jpeg_frames)
    rate, scale = int(round(fps * 1000)), 1000
    us_pf = int(1_000_000 / fps) if fps else 0
    max_size = max((len(f) for f in jpeg_frames), default=0)

    avih = struct.pack(
        "<14I", us_pf, max_size * int(max(fps, 1)), 0, 0x10, n, 0, 1,
        max_size, width, height, 0, 0, 0, 0
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIiI", 0, 0, 0, 0, scale, rate, 0, n,
                      max_size, -1, 0)
        + struct.pack("<4h", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_body = b""
    idx = b""
    for f in jpeg_frames:
        # idx1 offsets are relative to the 'movi' fourcc position
        idx += b"00dc" + struct.pack("<III", 0x10, 4 + len(movi_body), len(f))
        movi_body += _chunk(b"00dc", f)
    movi = _list(b"movi", movi_body)
    riff_body = b"AVI " + hdrl + movi + _chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body
