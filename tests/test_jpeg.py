"""Baseline JPEG codec (functions/jpeg.py) + JPEG-in-TIFF integration.

The codec is written from the public ITU-T T.81 spec; with no libjpeg in
the container, correctness is established by (a) spec-derived invariants
(smooth images round-trip within 1 LSB at high quality, abbreviated /
restart-interval variants decode bit-identically to the plain stream),
(b) decode determinism, and (c) the TIFF Technote 2 contract end-to-end
through the GeoTIFF reader/writer (reference reads JPEG-in-TIFF via GDAL:
gdal_raster_wrapper.cpp:22-95).
"""

import numpy as np
import pytest

from exactextractr_ray.functions.jpeg import (
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_tables,
)


def _smooth(h, w):
    x, y = np.meshgrid(np.linspace(0, 255, w), np.linspace(0, 255, h))
    return ((x + y) / 2).astype(np.uint8)


def test_gray_smooth_roundtrip_tight():
    img = _smooth(90, 120)
    out = decode_jpeg(encode_jpeg(img, quality=95, subsampling="4:4:4"))
    assert out.shape == img.shape and out.dtype == np.uint8
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 1


def test_gray_odd_dims():
    img = _smooth(37, 53)  # non-MCU-aligned: exercises edge crop
    out = decode_jpeg(encode_jpeg(img, quality=95, subsampling="4:4:4"))
    assert out.shape == (37, 53)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 1


def test_rgb_444_and_420():
    base = _smooth(41, 59)
    rgb = np.stack([base, (255 - base).astype(np.uint8), base // 2], axis=-1)
    out444 = decode_jpeg(encode_jpeg(rgb, quality=95, subsampling="4:4:4"))
    assert out444.shape == (41, 59, 3)
    assert np.abs(out444.astype(int) - rgb.astype(int)).max() <= 3
    out420 = decode_jpeg(encode_jpeg(rgb, quality=95, subsampling="4:2:0"))
    assert out420.shape == (41, 59, 3)
    # chroma is smooth, so 2x2 averaging stays close
    assert np.abs(out420.astype(int) - rgb.astype(int)).mean() < 3


def test_decode_deterministic():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (24, 40), dtype=np.uint8)
    b = encode_jpeg(img, quality=60, subsampling="4:4:4")
    assert np.array_equal(decode_jpeg(b), decode_jpeg(b))


def test_restart_interval_bit_identical():
    img = _smooth(64, 80)
    plain = decode_jpeg(encode_jpeg(img, quality=85, subsampling="4:4:4"))
    with_ri = decode_jpeg(
        encode_jpeg(img, quality=85, subsampling="4:4:4", restart_interval=3)
    )
    assert np.array_equal(plain, with_ri)


def test_abbreviated_tables_stream():
    # TIFF JPEGTables contract: tables-only stream + table-less image stream
    img = _smooth(48, 64)
    full = decode_jpeg(encode_jpeg(img, quality=80, subsampling="4:4:4"))
    ab = encode_jpeg(img, quality=80, subsampling="4:4:4",
                     include_tables=False)
    tb = encode_jpeg_tables(gray=True, quality=80)
    assert np.array_equal(decode_jpeg(ab, tables=tb), full)
    # the abbreviated stream alone has no tables
    with pytest.raises((ValueError, KeyError)):
        decode_jpeg(ab)


def test_rgb_abbreviated_with_restarts():
    base = _smooth(32, 48)
    rgb = np.stack([base] * 3, axis=-1)
    full = decode_jpeg(encode_jpeg(rgb, quality=85))
    ab = encode_jpeg(rgb, quality=85, include_tables=False,
                     restart_interval=2)
    tb = encode_jpeg_tables(gray=False, quality=85)
    assert np.array_equal(decode_jpeg(ab, tables=tb), full)


def test_unsupported_markers_raise():
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01not a jpeg")
    # synthetic SOF2 (progressive-with-no-scan) header must be rejected,
    # not mis-decoded, when the stream carries no scan data
    img = _smooth(16, 16)
    b = bytearray(encode_jpeg(img, quality=85, subsampling="4:4:4"))
    i = b.find(b"\xff\xc0")
    b[i + 1] = 0xCB  # SOF11 (arithmetic lossless): genuinely unsupported
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(b))


def test_truncated_stream_raises():
    img = _smooth(16, 16)
    b = encode_jpeg(img, quality=85, subsampling="4:4:4")
    with pytest.raises(ValueError):
        decode_jpeg(b[:20])


def test_multimodal_decoder_dispatches_jpeg():
    from exactextractr_ray.stages.multimodal import CodecDecoder

    img = _smooth(40, 40)
    payload = encode_jpeg(img, quality=95, subsampling="4:4:4")
    dec = CodecDecoder(target_hw=(8, 8))
    px = dec.decode_one(payload, 40, 40)
    assert px.shape == (8, 8) and px.dtype == np.float32
    # luma of a grayscale JPEG ~= the image itself
    from exactextractr_ray.functions.codecs import resize_nearest

    want = resize_nearest(img, (8, 8)).astype(np.float32)
    assert np.abs(px - want).max() <= 1.0


# ---------------- JPEG-in-TIFF (Technote 2) ----------------


def _grid(w, h):
    from exactextractr_ray.grid import Grid

    return Grid(0.0, 0.0, float(w), float(h), 1.0, 1.0)


@pytest.mark.parametrize("tile", [None, 32])
def test_geotiff_jpeg_roundtrip(tmp_path, tile):
    from exactextractr_ray.sources.geotiff import read_geotiff, write_geotiff

    img = _smooth(97, 130)
    p = str(tmp_path / "j.tif")
    write_geotiff(img, _grid(130, 97), p, compression=7, tile=tile,
                  jpeg_quality=95)
    arr, meta = read_geotiff(p)
    assert arr.shape == (97, 130)
    assert np.abs(arr - img).max() <= 2
    assert meta.grid.xmin == 0.0 and meta.grid.dx == 1.0


def test_geotiff_jpeg_uses_jpeg_tables_tag(tmp_path):
    from exactextractr_ray.sources import geotiff as gt

    img = _smooth(64, 64)
    p = str(tmp_path / "t.tif")
    gt.write_geotiff(img, _grid(64, 64), p, compression=7, tile=32,
                     jpeg_quality=90)
    data = open(p, "rb").read()
    endian, big, off = gt._tiff_header(data)
    tags = gt._ifd_chain(data, endian, big, off)[0]
    jt = bytes(tags[347])
    assert jt[:2] == b"\xff\xd8" and jt[-2:] == b"\xff\xd9"
    assert b"\xff\xdb" in jt and b"\xff\xc4" in jt  # DQT + DHT present
    # per-chunk streams are abbreviated (no DQT of their own)
    o = tags[324][0]
    c = tags[325][0]
    chunk = data[o : o + c]
    assert b"\xff\xdb" not in chunk[:200]


def test_geotiff_jpeg_rgb_bands(tmp_path):
    from exactextractr_ray.sources.geotiff import read_geotiff, write_geotiff

    base = _smooth(48, 72)
    rgb = np.stack([base, (255 - base).astype(np.uint8), base // 2], axis=-1)
    p = str(tmp_path / "rgb.tif")
    write_geotiff(rgb, _grid(72, 48), p, compression=7, jpeg_quality=95)
    for b in (1, 2, 3):
        arr, _ = read_geotiff(p, band=b)
        assert np.abs(arr - rgb[:, :, b - 1]).max() <= 3


def test_geotiff_jpeg_overviews(tmp_path):
    from exactextractr_ray.sources.geotiff import read_geotiff, write_geotiff

    img = _smooth(97, 130)
    p = str(tmp_path / "ov.tif")
    write_geotiff(img, _grid(130, 97), p, compression=7, tile=32,
                  overviews=[2], jpeg_quality=95)
    ov, meta = read_geotiff(p, overview=0)
    assert ov.shape == (49, 65)
    assert np.abs(ov - img[::2, ::2]).max() <= 2
    # overview keeps full extent at coarser cell size
    assert meta.grid.xmax == 130.0


def test_geotiff_jpeg_rejects_nonuint8(tmp_path):
    from exactextractr_ray.sources.geotiff import write_geotiff

    with pytest.raises(ValueError):
        write_geotiff(np.zeros((8, 8), np.float32), _grid(8, 8),
                      str(tmp_path / "x.tif"), compression=7)


def test_geotiff_jpeg_zonal_parity(tmp_path):
    """JPEG raster flows through the normal zonal path; stats match the
    in-memory array's stats exactly (same decoded pixels)."""
    from exactextractr_ray.sources.geotiff import (
        geotiff_raster_dataset,
        read_geotiff,
        write_geotiff,
    )

    img = _smooth(64, 64)
    p = str(tmp_path / "z.tif")
    write_geotiff(img, _grid(64, 64), p, compression=7, jpeg_quality=95)
    arr, _ = read_geotiff(p)
    rd = geotiff_raster_dataset(p, tile=32)
    vals = np.concatenate(
        [b["values"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
         for b in rd.ds.iter_batches(batch_size=None, batch_format="pyarrow")]
    )
    assert vals.size == 64 * 64
    assert float(vals.sum()) == float(np.nansum(arr))


# ---------------- progressive decode (T.81 Annex G.2) ----------------


def _prog_encode_rgb444(img, quality=90):
    """Test-side minimal PROGRESSIVE encoder (spectral selection + DC
    successive approximation, 4:4:4): scans = interleaved DC first (Al=1),
    DC refinement (Ah=1), then one full-band AC scan per component. Decoded
    output must be bit-identical to the baseline encoding of the same
    image at the same quality (identical quantized coefficients)."""
    import struct

    import exactextractr_ray.functions.jpeg as J

    h, w = img.shape[:2]
    rgbf = img.astype(np.float64)
    r, g, b = rgbf[:, :, 0], rgbf[:, :, 1], rgbf[:, :, 2]
    yp = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    planes = [np.clip(np.round(p), 0, 255).astype(np.uint8)
              for p in (yp, cb, cr)]
    qt_l = J._quality_scale(J.QT_LUMA, quality)
    qt_c = J._quality_scale(J.QT_CHROMA, quality)
    qts = [qt_l, qt_c, qt_c]
    qb = [J._fdct_quant(J._plane_blocks(p), qt) for p, qt in zip(planes, qts)]
    by, bx = qb[0].shape[:2]
    dc_l = J._huff_encode_map(J.DC_LUMA_BITS, J.DC_LUMA_VALS)
    dc_c = J._huff_encode_map(J.DC_CHROMA_BITS, J.DC_CHROMA_VALS)
    ac_l = J._huff_encode_map(J.AC_LUMA_BITS, J.AC_LUMA_VALS)
    ac_c = J._huff_encode_map(J.AC_CHROMA_BITS, J.AC_CHROMA_VALS)
    dcm = [dc_l, dc_c, dc_c]
    acm = [ac_l, ac_c, ac_c]

    def sos(comps, ss, se, ah, al):
        p = bytes([len(comps)])
        for ci in comps:
            p += bytes([ci + 1, (0x00 if ci == 0 else 0x11)])
        return J._marker(0xDA, p + bytes([ss, se, (ah << 4) | al]))

    out = bytearray(b"\xff\xd8")
    out += J._marker(0xDB, J._dqt_payload(0, qt_l))
    out += J._marker(0xDB, J._dqt_payload(1, qt_c))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for ci in range(3):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out += J._marker(0xC2, sof)  # SOF2: progressive
    out += J._marker(0xC4, J._dht_payload(0, 0, J.DC_LUMA_BITS, J.DC_LUMA_VALS))
    out += J._marker(0xC4, J._dht_payload(1, 0, J.AC_LUMA_BITS, J.AC_LUMA_VALS))
    out += J._marker(0xC4, J._dht_payload(0, 1, J.DC_CHROMA_BITS, J.DC_CHROMA_VALS))
    out += J._marker(0xC4, J._dht_payload(1, 1, J.AC_CHROMA_BITS, J.AC_CHROMA_VALS))

    # scan 1: interleaved DC first, Al=1 (DPCM over dc >> 1)
    out += sos([0, 1, 2], 0, 0, 0, 1)
    bw = J._BitWriter()
    pred = [0, 0, 0]
    for yy in range(by):
        for xx in range(bx):
            for ci in range(3):
                dc = int(qb[ci][yy, xx][J.ZIGZAG[0]]) >> 1
                diff = dc - pred[ci]
                pred[ci] = dc
                s = abs(diff).bit_length()
                code, ln = dcm[ci][s]
                bw.put(code, ln)
                if s:
                    bw.put(diff if diff > 0 else diff + (1 << s) - 1, s)
    bw.flush()
    out += bw.out

    # scan 2: DC refinement (Ah=1, Al=0): bit0 of each DC, same block order
    out += sos([0, 1, 2], 0, 0, 1, 0)
    bw = J._BitWriter()
    for yy in range(by):
        for xx in range(bx):
            for ci in range(3):
                bw.put(int(qb[ci][yy, xx][J.ZIGZAG[0]]) & 1, 1)
    bw.flush()
    out += bw.out

    # scans 3-5: full-band AC first per component (Ss=1..63, Al=0)
    for ci in range(3):
        out += sos([ci], 1, 63, 0, 0)
        bw = J._BitWriter()
        for yy in range(by):
            for xx in range(bx):
                zz = qb[ci][yy, xx][J.ZIGZAG]
                nz = np.nonzero(zz[1:])[0] + 1
                k = 1
                for idx in nz.tolist():
                    run = idx - k
                    while run >= 16:
                        code, ln = acm[ci][0xF0]
                        bw.put(code, ln)
                        run -= 16
                    v = int(zz[idx])
                    s = abs(v).bit_length()
                    code, ln = acm[ci][(run << 4) | s]
                    bw.put(code, ln)
                    bw.put(v if v > 0 else v + (1 << s) - 1, s)
                    k = idx + 1
                if k < 64:
                    code, ln = acm[ci][0x00]  # EOB (eobrun = 1)
                    bw.put(code, ln)
        bw.flush()
        out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def test_progressive_matches_baseline_bit_exact():
    base = _smooth(41, 53)
    rgb = np.stack([base, (255 - base).astype(np.uint8), base // 3], axis=-1)
    want = decode_jpeg(encode_jpeg(rgb, quality=90, subsampling="4:4:4"))
    got = decode_jpeg(_prog_encode_rgb444(rgb, quality=90))
    assert np.array_equal(got, want)


@pytest.mark.parametrize(
    "path",
    [
        "/usr/share/doc/nodejs/thin-white-stripe.jpg",
        "/usr/share/doc/nodejs/full-white-stripe.jpg",
    ],
)
def test_progressive_real_world_files(path):
    """Real progressive JPEGs (libjpeg-produced, on the host): exercise
    non-interleaved DC scans, spectral selection, AC successive
    approximation (Al=1) and AC refinement (Ah=1). A Huffman desync would
    error or produce noise; these brand assets decode near-white."""
    import os

    if not os.path.exists(path):
        pytest.skip("host fixture not present")
    img = decode_jpeg(open(path, "rb").read())
    assert img.ndim == 3 and img.dtype == np.uint8
    assert img.shape[1] == 493  # known asset width
    assert float(img.mean()) > 200  # predominantly white artwork
    assert img.max() == 255
    # deterministic
    assert np.array_equal(img, decode_jpeg(open(path, "rb").read()))


# ---------------- EXIF orientation + corrupt-payload policy ----------------


def _with_exif(jpeg: bytes, orientation: int) -> bytes:
    """Splice a minimal APP1 EXIF segment (II TIFF, IFD0 with tag 274)
    right after SOI."""
    import struct

    tiff = (b"II*\x00" + struct.pack("<I", 8)          # IFD0 at offset 8
            + struct.pack("<H", 1)                      # one entry
            + struct.pack("<HHI", 274, 3, 1)
            + struct.pack("<HH", orientation, 0)
            + struct.pack("<I", 0))                     # next IFD: none
    payload = b"Exif\x00\x00" + tiff
    app1 = b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload
    return jpeg[:2] + app1 + jpeg[2:]


def test_exif_orientation_parse_and_apply():
    from exactextractr_ray.functions.jpeg import (
        apply_orientation,
        exif_orientation,
    )

    img = _smooth(20, 30)
    plain = encode_jpeg(img, quality=90, subsampling="4:4:4")
    assert exif_orientation(plain) == 1
    for o in range(1, 9):
        assert exif_orientation(_with_exif(plain, o)) == o
    # rotate-90-CW (6): landscape storage displays portrait
    assert apply_orientation(img, 6).shape == (30, 20)
    assert apply_orientation(img, 3)[0, 0] == img[-1, -1]
    # round-trip pairs: 6 then 8 restores
    assert np.array_equal(
        apply_orientation(apply_orientation(img, 6), 8), img
    )


def test_codec_decoder_applies_exif():
    from exactextractr_ray.stages.multimodal import CodecDecoder

    img = _smooth(16, 24)
    rotated = _with_exif(
        encode_jpeg(img, quality=95, subsampling="4:4:4"), 6)
    px = CodecDecoder(target_hw=(24, 16)).decode_one(rotated, 24, 16)
    # after orientation the image is 24x16; resize is identity
    from exactextractr_ray.functions.jpeg import apply_orientation

    want = apply_orientation(img, 6).astype(np.float32)
    assert np.abs(px - want).max() <= 1.0


def test_decode_images_on_error_skip(ray_session):
    import pyarrow as pa
    import ray.data

    from exactextractr_ray.stages.multimodal import (
        decode_images,
        synth_jpeg_table,
    )

    tbl = synth_jpeg_table(8, hw=(16, 16))
    # corrupt rows 2 and 5: truncated + garbage
    payloads = tbl.column("payload").to_pylist()
    payloads[2] = payloads[2][:30]
    payloads[5] = b"\xff\xd8\xff\xee" + b"\x07" * 40
    tbl = tbl.set_column(
        tbl.schema.get_field_index("payload"), "payload",
        pa.array(payloads, pa.binary()),
    )
    ds = ray.data.from_arrow(tbl)
    ok = decode_images(ds, target_hw=(4, 4), fake=False, batch_size=4,
                       on_error="skip").to_pandas()
    assert sorted(ok["media_id"]) == [0, 1, 3, 4, 6, 7]
    import pytest as _pt

    with _pt.raises(Exception):
        decode_images(ds, target_hw=(4, 4), fake=False,
                      batch_size=4).to_pandas()


def test_sample_frames_on_error_skip(ray_session):
    import pyarrow as pa
    import ray.data

    from exactextractr_ray.stages.multimodal import (
        sample_frames,
        synth_mjpeg_avi_table,
    )

    tbl = synth_mjpeg_avi_table(4, hw=(16, 16), n_frames=3)
    payloads = tbl.column("payload").to_pylist()
    payloads[1] = payloads[1][:40]  # truncated container
    tbl = tbl.set_column(
        tbl.schema.get_field_index("payload"), "payload",
        pa.array(payloads, pa.binary()),
    )
    out = sample_frames(
        ray.data.from_arrow(tbl), k=2, target_hw=(4, 4), fake=False,
        batch_size=2, on_error="skip",
    ).to_pandas()
    assert sorted(set(out["media_id"])) == [0, 2, 3]


def test_exif_gps_roundtrip_and_stage(ray_session):
    """GPS DMS rationals written into a real APP1 segment read back to the
    exact decimal degrees; the batch stage drops GPS-less rows and feeds
    the PIP join (the multimodal -> geospatial bridge)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from exactextractr_ray.functions.jpeg import (
        encode_jpeg,
        exif_gps,
        exif_gps_app1,
        insert_app1,
    )
    from exactextractr_ray.stages.geocode import exif_gps_batch

    base = encode_jpeg(np.full((8, 8), 99, np.uint8), quality=80)
    tagged = insert_app1(base, exif_gps_app1(
        ((47, 1), (22, 1), (4012, 100)), ((8, 1), (32, 1), (551, 100)),
        lat_ref="N", lon_ref="E",
    ))
    want = (8 + 32 / 60.0 + (551 / 100) / 3600.0,
            47 + 22 / 60.0 + (4012 / 100) / 3600.0)
    assert exif_gps(tagged) == want
    assert exif_gps(base) is None
    sw = insert_app1(base, exif_gps_app1(
        ((1, 1), (30, 1), (0, 1)), ((2, 1), (15, 1), (0, 1)), "S", "W"))
    assert exif_gps(sw) == (-2.25, -1.5)

    tbl = pa.table({
        "photo_id": pa.array([0, 1, 2], pa.int64()),
        "payload": pa.array([tagged, base, sw], pa.binary()),
    })
    out = (
        ray.data.from_arrow(tbl)
        .map_batches(exif_gps_batch, batch_format="pyarrow")
        .to_pandas()
        .sort_values("photo_id")
    )
    assert out["photo_id"].tolist() == [0, 2]  # GPS-less row dropped
    assert out["lon"].tolist() == [want[0], -2.25]
    assert out["lat"].tolist() == [want[1], -1.5]
