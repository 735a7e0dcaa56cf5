"""MP3 and Ogg (Opus/Vorbis/Theora/FLAC/Speex) metadata probes.

The compressed-audio formats that dominate web crawls alongside WAV:
their PAYLOAD decode needs the codecs' psychoacoustic filterbanks /
empirical Huffman tables, but the framing layers are fully algorithmic
public structures, so the probe tier (codec, bitrate, sample rate,
channels, duration, frame count) is implementable and verifiable
offline — which is the tier a corpus pipeline actually runs at scale.

- MPEG audio (MP3): ISO/IEC 11172-3 / 13818-3 frame headers. The
  bitrate/sample-rate index tables are small published constants whose
  correctness is STRUCTURALLY self-checking here: the frame-length
  formula chains each header to the next sync word, so a wrong entry
  desynchronizes the walk (validated against a real LAME file on this
  host). ID3v2 (syncsafe sizes) skipped; Xing/Info/VBRI VBR headers
  read for exact frame counts.
- Ogg (RFC 3533): page capture/lacing walk with the spec's CRC-32
  (poly 0x04C11DB7, unreflected, init/xorout 0), first-packet codec
  identification (OpusHead RFC 7845 §5.1, Vorbis ident header §4.2.2,
  Theora, FLAC-in-Ogg, Speex), duration from the terminal granule
  position. ``encode_ogg`` writes spec-conformant fixture streams
  (correct CRCs, continuation lacing) so every read path round-trips.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "parse_mp3",
    "parse_ogg",
    "encode_ogg",
    "ogg_crc",
    "ogg_packets",
    "decode_ogg_flac",
    "encode_ogg_flac",
]

# ---------------- MPEG audio (MP3) ----------------

# bitrate kbps by [version_group][layer][index]; index 0 = free, 15 = bad
# (ISO 11172-3 / 13818-3 published tables)
_BITRATES = {
    # MPEG-1
    (1, 1): (0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384,
             416, 448),
    (1, 2): (0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256,
             320, 384),
    (1, 3): (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
             256, 320),
    # MPEG-2 / 2.5
    (2, 1): (0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192,
             224, 256),
    (2, 2): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    (2, 3): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}
_RATES = {1: (44100, 48000, 32000), 2: (22050, 24000, 16000),
          25: (11025, 12000, 8000)}
# samples per frame by (version_group, layer)
_SPF = {(1, 1): 384, (1, 2): 1152, (1, 3): 1152,
        (2, 1): 384, (2, 2): 1152, (2, 3): 576}


def _mp3_frame(data: bytes, pos: int):
    """Parse one MPEG audio frame header at pos -> (frame_len, info) or
    None if not a valid header."""
    if pos + 4 > len(data):
        return None
    h = struct.unpack(">I", data[pos:pos + 4])[0]
    if (h >> 21) & 0x7FF != 0x7FF:
        return None
    ver_bits = (h >> 19) & 3      # 0=2.5, 2=MPEG2, 3=MPEG1 (1 reserved)
    layer_bits = (h >> 17) & 3    # 3=I, 2=II, 1=III (0 reserved)
    if ver_bits == 1 or layer_bits == 0:
        return None
    version = {0: 25, 2: 2, 3: 1}[ver_bits]
    layer = 4 - layer_bits
    group = 1 if version == 1 else 2
    br_idx = (h >> 12) & 0xF
    sr_idx = (h >> 10) & 3
    if br_idx in (0, 15) or sr_idx == 3:
        return None
    bitrate = _BITRATES[(group, layer)][br_idx] * 1000
    rate = _RATES[version][sr_idx]
    padding = (h >> 9) & 1
    mode = (h >> 6) & 3           # 3 = mono
    if layer == 1:
        flen = (12 * bitrate // rate + padding) * 4
    else:
        spf = _SPF[(group, layer)]
        flen = spf // 8 * bitrate // rate + padding
    return flen, {
        "version": version, "layer": layer, "bitrate": bitrate,
        "sample_rate": rate, "channels": 1 if mode == 3 else 2,
        "samples_per_frame": _SPF[(group, layer)],
    }


def parse_mp3(data: bytes) -> dict:
    """MP3 bytes -> {"sample_rate", "channels", "bitrate", "n_frames",
    "duration_s", "layer", "version", "vbr", "id3_size"}.

    Walks every frame (headers chain by the frame-length formula, so
    the walk itself validates the tables); bitrate is the mean over
    frames (exact for CBR); Xing/Info/VBRI headers mark VBR."""
    pos = 0
    id3 = 0
    if data[:3] == b"ID3" and len(data) >= 10:
        # ID3v2: syncsafe 28-bit size after the 10-byte header
        sz = ((data[6] & 0x7F) << 21) | ((data[7] & 0x7F) << 14) | \
             ((data[8] & 0x7F) << 7) | (data[9] & 0x7F)
        id3 = 10 + sz + (10 if data[5] & 0x10 else 0)  # footer flag
        pos = id3
    # resync: scan for the first valid header that chains to a second one
    n = len(data)
    while pos < n - 4:
        fr = _mp3_frame(data, pos)
        if fr and (pos + fr[0] >= n - 4 or _mp3_frame(data, pos + fr[0])):
            break
        pos += 1
    frames = 0
    samples = 0
    bitrate_sum = 0
    info: dict = {}
    vbr = False
    first = True
    while pos < n - 4:
        fr = _mp3_frame(data, pos)
        if fr is None:
            break
        flen, fi = fr
        meta_frame = False
        if first:
            info = fi
            # Xing/Info (VBR) header sits after the side info
            side = (17 if fi["channels"] == 1 else 32) if fi["version"] == 1 \
                else (9 if fi["channels"] == 1 else 17)
            tag_at = pos + 4 + side
            tag = data[tag_at:tag_at + 4]
            if tag in (b"Xing", b"Info"):
                vbr = tag == b"Xing"
                meta_frame = True
            elif data[pos + 36:pos + 40] == b"VBRI":
                vbr = True
                meta_frame = True
            first = False
        if not meta_frame:
            # A Xing/Info/VBRI header frame carries no audio: tools (and
            # the Xing frame-count field itself) exclude it from frame /
            # duration / bitrate accounting, so we do too.
            frames += 1
            samples += fi["samples_per_frame"]
            bitrate_sum += fi["bitrate"]
        if flen <= 0:
            break
        pos += flen
    rate = info.get("sample_rate", 0)
    return {
        "kind": "audio/mpeg",
        "version": info.get("version", 0),
        "layer": info.get("layer", 0),
        "sample_rate": rate,
        "channels": info.get("channels", 0),
        "bitrate": (bitrate_sum // frames) if frames else 0,
        "n_frames": frames,
        "duration_s": samples / rate if rate else 0.0,
        "vbr": vbr,
        "id3_size": id3,
    }


# ---------------- Ogg (RFC 3533) ----------------

_OGG_CRC_TABLE = None


def ogg_crc(data: bytes) -> int:
    """RFC 3533 §6: CRC-32, polynomial 0x04C11DB7, UNreflected,
    init 0, no final xor (differs from zlib's crc32)."""
    global _OGG_CRC_TABLE
    if _OGG_CRC_TABLE is None:
        tbl = np.zeros(256, np.uint32)
        for i in range(256):
            r = np.uint32(i << 24)
            for _ in range(8):
                r = np.uint32((int(r) << 1) ^ 0x04C11DB7) if int(r) & 0x80000000 \
                    else np.uint32(int(r) << 1)
            tbl[i] = r
        _OGG_CRC_TABLE = tbl
    crc = 0
    tbl = _OGG_CRC_TABLE
    for b in data:
        crc = ((crc << 8) ^ int(tbl[((crc >> 24) ^ b) & 0xFF])) & 0xFFFFFFFF
    return crc


def _iter_ogg_pages(data: bytes):
    """Yield (header_type, granule, serial, seq, [segment bytes],
    page_start, page_end) for each page."""
    pos = 0
    n = len(data)
    while pos + 27 <= n:
        if data[pos:pos + 4] != b"OggS":
            nxt = data.find(b"OggS", pos + 1)
            if nxt < 0:
                return
            pos = nxt
            continue
        (version, htype, granule, serial, seq, _crc, nsegs) = struct.unpack(
            "<BBqIIIB", data[pos + 4:pos + 27]
        )
        if version != 0:
            return
        lacing = data[pos + 27:pos + 27 + nsegs]
        body = pos + 27 + nsegs
        sizes = list(lacing)
        total = sum(sizes)
        if body + total > n:
            return
        segs = []
        off = body
        for s in sizes:
            segs.append((off, s))
            off += s
        yield htype, granule, serial, seq, segs, sizes, pos, body + total
        pos = body + total


def parse_ogg(data: bytes) -> dict:
    """Ogg bytes -> {"codec", "sample_rate", "channels", "duration_s",
    "n_pages", "n_packets", "width", "height", "pre_skip"} from the
    first logical stream's identification packet + terminal granule.

    Codec detection: OpusHead (RFC 7845), \\x01vorbis (Vorbis I §4.2.2),
    \\x80theora, \\x7fFLAC (Ogg-FLAC mapping), Speex."""
    if data[:4] != b"OggS":
        raise ValueError("not an Ogg stream")
    out = {
        "codec": "", "sample_rate": 0, "channels": 0, "duration_s": 0.0,
        "n_pages": 0, "n_packets": 0, "width": 0, "height": 0,
        "pre_skip": 0,
    }
    first_serial = None
    last_granule = 0
    first_packet = b""
    got_first = False
    for htype, granule, serial, _seq, segs, sizes, _ps, _pe in \
            _iter_ogg_pages(data):
        out["n_pages"] += 1
        if first_serial is None:
            first_serial = serial
        if serial != first_serial:
            continue
        # packets end at lacing values < 255
        out["n_packets"] += sum(1 for s in sizes if s < 255)
        if granule >= 0:
            last_granule = max(last_granule, granule)
        if not got_first and segs:
            b0, s0 = segs[0]
            first_packet = bytes(data[b0:b0 + min(s0, 64)])
            got_first = True
    p = first_packet
    if p.startswith(b"OpusHead"):
        out["codec"] = "opus"
        out["channels"] = p[9]
        out["pre_skip"] = struct.unpack("<H", p[10:12])[0]
        out["sample_rate"] = struct.unpack("<I", p[12:16])[0]
        # granule is ALWAYS 48 kHz samples for Opus (RFC 7845 §4)
        out["duration_s"] = max(last_granule - out["pre_skip"], 0) / 48000.0
    elif p.startswith(b"\x01vorbis"):
        out["codec"] = "vorbis"
        out["channels"] = p[11]
        out["sample_rate"] = struct.unpack("<I", p[12:16])[0]
        if out["sample_rate"]:
            out["duration_s"] = last_granule / out["sample_rate"]
    elif p.startswith(b"\x80theora"):
        out["codec"] = "theora"
        # frame_width/height in macroblocks at bytes 10..14 (16-bit each)
        fmbw, fmbh = struct.unpack(">HH", p[10:14])
        out["width"], out["height"] = fmbw * 16, fmbh * 16
    elif p.startswith(b"\x7fFLAC"):
        out["codec"] = "flac"
        # STREAMINFO follows the 9-byte mapping header + 4-byte block hdr
        si = p[13 + 4:]
        if len(si) >= 18:
            out["sample_rate"] = (si[10] << 12) | (si[11] << 4) | (si[12] >> 4)
            out["channels"] = ((si[12] >> 1) & 7) + 1
    elif p.startswith(b"Speex   "):
        out["codec"] = "speex"
        out["sample_rate"] = struct.unpack("<I", p[36:40])[0]
        out["channels"] = struct.unpack("<I", p[48:52])[0]
    return out


def encode_ogg(
    packets: list[bytes],
    codec: str = "opus",
    sample_rate: int = 48000,
    channels: int = 2,
    granules: list[int] | None = None,
    serial: int = 0x1234,
) -> bytes:
    """Packets -> a minimal spec-conformant single-stream Ogg file with
    correct CRCs: a BOS page carrying the codec identification header
    (OpusHead / Vorbis ident), then one page per data packet (255-byte
    continuation lacing for big packets). ``granules[i]`` stamps the
    i-th data page (defaults to cumulative packet index)."""
    if codec == "opus":
        ident = (b"OpusHead" + bytes([1, channels])
                 + struct.pack("<H", 312)          # pre-skip
                 + struct.pack("<I", sample_rate)
                 + struct.pack("<hB", 0, 0))
    elif codec == "vorbis":
        ident = (b"\x01vorbis" + struct.pack("<I", 0) + bytes([channels])
                 + struct.pack("<I", sample_rate)
                 + struct.pack("<iii", 0, 0, 0) + bytes([0xB8, 1]))
    else:
        raise ValueError("fixture muxer writes opus or vorbis")

    def page(htype: int, granule: int, seq: int, body: bytes) -> bytes:
        sizes = []
        rem = len(body)
        while True:
            sizes.append(min(rem, 255))
            rem -= sizes[-1]
            if sizes[-1] < 255:
                break
        hdr = (b"OggS" + struct.pack("<BBqIII", 0, htype, granule, serial,
                                     seq, 0) + bytes([len(sizes)])
               + bytes(sizes))
        crc = ogg_crc(hdr + body)
        hdr = hdr[:22] + struct.pack("<I", crc) + hdr[26:]
        return hdr + body

    out = page(0x02, 0, 0, ident)  # BOS
    for i, pkt in enumerate(packets):
        g = granules[i] if granules else (i + 1) * 960
        htype = 0x04 if i == len(packets) - 1 else 0
        out += page(htype, g, i + 1, pkt)
    return out


def ogg_packets(data: bytes, serial: int | None = None) -> list[bytes]:
    """Reassemble the logical packets of one Ogg stream (RFC 3533
    lacing: a packet ends at a segment < 255 bytes; the page
    continuation flag carries packets across pages)."""
    out: list[bytes] = []
    pending = b""
    want = serial
    for htype, _gr, ser, _seq, segs, sizes, _ps, _pe in _iter_ogg_pages(
        data
    ):
        if want is None:
            want = ser
        if ser != want:
            continue
        if not (htype & 0x01):  # not a continuation: drop stale partial
            pending = b""
        for (off, _s), sz in zip(segs, sizes):
            pending += data[off:off + sz]
            if sz < 255:
                out.append(pending)
                pending = b""
    return out


def decode_ogg_flac(data: bytes):
    """FLAC-in-Ogg (the Ogg FLAC mapping) -> (samples, rate, bits) via
    functions/flac.py: packet 0 is the mapping header carrying the
    native ``fLaC`` signature + STREAMINFO; the advertised header
    packets follow; every later packet is one native FLAC frame —
    reassembling them yields a native stream the bit-exact decoder
    already handles."""
    from .flac import decode_flac

    pkts = ogg_packets(data)
    if not pkts or not pkts[0].startswith(b"\x7fFLAC"):
        raise ValueError("not an Ogg-FLAC stream")
    n_headers = struct.unpack(">H", pkts[0][7:9])[0]
    native = bytearray(pkts[0][9:])  # "fLaC" + STREAMINFO block
    if len(native) < 5:
        raise ValueError("truncated Ogg-FLAC mapping header")
    native[4] |= 0x80  # force last-metadata flag (headers are skipped)
    audio = pkts[1 + n_headers:]
    return decode_flac(bytes(native) + b"".join(audio))


def encode_ogg_flac(samples, sample_rate: int = 44100, **kw) -> bytes:
    """Fixture muxer: native FLAC (functions/flac.py) split into the
    Ogg FLAC mapping — header packet + one packet per frame."""
    from .flac import encode_flac, flac_info

    native = encode_flac(samples, sample_rate, **kw)
    info = flac_info(native)
    frames_at = info["frames_at"]
    header = (b"\x7fFLAC" + bytes([1, 0]) + struct.pack(">H", 0)
              + native[:frames_at])
    # split the frame section at frame sync boundaries (0xFF 0xF8+)
    body = native[frames_at:]
    bounds = [0]
    i = 2
    while i < len(body) - 1:
        if body[i] == 0xFF and (body[i + 1] & 0xFC) == 0xF8:
            bounds.append(i)
            i += 2
        else:
            i += 1
    bounds.append(len(body))
    frames = [body[a:b] for a, b in zip(bounds, bounds[1:]) if b > a]
    packets = [header] + frames
    # reuse the page writer from encode_ogg via a local serializer
    out = b""
    for i, pkt in enumerate(packets):
        sizes = []
        rem = len(pkt)
        while True:
            sizes.append(min(rem, 255))
            rem -= sizes[-1]
            if sizes[-1] < 255:
                break
        htype = 0x02 if i == 0 else (0x04 if i == len(packets) - 1 else 0)
        hdr = (b"OggS" + struct.pack("<BBqIII", 0, htype, i, 0x46AC,
                                     i, 0) + bytes([len(sizes)])
               + bytes(sizes))
        crc = ogg_crc(hdr + pkt)
        hdr = hdr[:22] + struct.pack("<I", crc) + hdr[26:]
        out += hdr + pkt
    return out
