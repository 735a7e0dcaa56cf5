"""GIF codec, MJPEG-AVI container, and the real (fake=False) video
frame-sampling pipeline.

GIF87a/89a and the AVI RIFF form are public specs; with no PIL/ffmpeg the
evidence is exact round-trips through this repo's own encoders (GIF is
lossless with an exact palette, MJPEG frames are near-lossless smooth
gradients), plus real-world GIFs shipped with host packages (libjpeg-free
environment: any LZW desync would produce noise or errors).
"""

import glob
import os

import numpy as np
import pytest

from exactextractr_ray.functions.gif import (
    decode_gif,
    decode_gif_frames,
    encode_gif,
)


def _pal_img(rng, pal, h, w):
    return pal[rng.integers(0, len(pal), (h, w))]


def test_gif_exact_roundtrip():
    rng = np.random.default_rng(3)
    pal = rng.integers(0, 256, (7, 3), dtype=np.uint8)
    img = _pal_img(rng, pal, 45, 61)
    out = decode_gif(encode_gif(img))
    assert np.array_equal(out, img)


def test_gif_interlaced_roundtrip():
    rng = np.random.default_rng(4)
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    img = _pal_img(rng, pal, 37, 23)
    assert np.array_equal(decode_gif(encode_gif(img, interlace=True)), img)


def test_gif_256_colors_code_width_growth():
    """Large 256-color image: LZW table must grow to 12-bit codes and hit
    the 4096-entry clear/reset path."""
    rng = np.random.default_rng(5)
    pal = np.stack(
        [np.arange(256, dtype=np.uint8),
         (np.arange(256) * 7 % 256).astype(np.uint8),
         (np.arange(256) * 13 % 256).astype(np.uint8)], axis=1)
    img = _pal_img(rng, pal, 200, 300)
    assert np.array_equal(decode_gif(encode_gif(img)), img)


def test_gif_animation_frames_and_delays():
    rng = np.random.default_rng(6)
    pal = rng.integers(0, 256, (5, 3), dtype=np.uint8)
    fr = [_pal_img(rng, pal, 20, 30) for _ in range(3)]
    frames, delays = decode_gif_frames(
        encode_gif(fr, delays_ms=[100, 50, 200]))
    assert delays == [100, 50, 200]
    assert all(np.array_equal(a, b) for a, b in zip(frames, fr))


def test_gif_two_color_min_code_size():
    rng = np.random.default_rng(7)
    img = np.where(rng.integers(0, 2, (10, 10, 1)).astype(bool),
                   np.uint8(255), np.uint8(0)) * np.ones(3, np.uint8)
    img = img.astype(np.uint8)
    assert np.array_equal(decode_gif(encode_gif(img)), img)


def test_gif_palette_overflow_rejected():
    rng = np.random.default_rng(8)
    img = rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
    if len(np.unique(img.reshape(-1, 3), axis=0)) > 256:
        with pytest.raises(ValueError):
            encode_gif(img)


def test_gif_real_world_host_files():
    files = sorted(glob.glob("/usr/share/doc/libxslt1-dev/html/*.gif"))
    if not files:
        pytest.skip("host fixtures not present")
    for p in files[:6]:
        frames, _ = decode_gif_frames(open(p, "rb").read())
        f = frames[0]
        assert f.ndim == 3 and f.dtype == np.uint8 and f.size > 0
        # decode is deterministic
        assert np.array_equal(f, decode_gif(open(p, "rb").read()))


def test_gif_bad_signature():
    with pytest.raises(ValueError):
        decode_gif(b"NOTAGIF" + b"\x00" * 20)


# ---------------- MJPEG AVI ----------------


def _avi_fixture(n_frames=6, w=64, h=48, fps=12.0):
    from exactextractr_ray.functions.avi import encode_mjpeg_avi
    from exactextractr_ray.functions.jpeg import encode_jpeg

    x, y = np.meshgrid(np.linspace(0, 255, w), np.linspace(0, 255, h))
    base = ((x + y) / 2).astype(np.uint8)
    frames = [np.clip(base.astype(int) + 10 * i, 0, 255).astype(np.uint8)
              for i in range(n_frames)]
    payload = encode_mjpeg_avi(
        [encode_jpeg(f, quality=95, subsampling="4:4:4") for f in frames],
        w, h, fps=fps)
    return payload, frames


def test_avi_parse_and_decode():
    from exactextractr_ray.functions.avi import decode_avi_frames, parse_avi

    payload, frames = _avi_fixture()
    info = parse_avi(payload)
    assert len(info["frames"]) == 6
    assert info["fps"] == 12.0
    assert (info["width"], info["height"]) == (64, 48)
    assert info["handler"] == "MJPG"
    dec, fps = decode_avi_frames(payload)
    assert fps == 12.0 and len(dec) == 6
    for d, f in zip(dec, frames):
        assert np.abs(d.astype(int) - f.astype(int)).max() <= 1


def test_avi_frame_subset():
    from exactextractr_ray.functions.avi import decode_avi_frames

    payload, frames = _avi_fixture()
    dec, _ = decode_avi_frames(payload, indices=[0, 5])
    assert len(dec) == 2
    assert np.abs(dec[1].astype(int) - frames[5].astype(int)).max() <= 1


def test_avi_rejects_non_avi():
    from exactextractr_ray.functions.avi import parse_avi

    with pytest.raises(ValueError):
        parse_avi(b"RIFFxxxxWAVE" + b"\x00" * 8)


def test_sniff_gif_and_avi():
    from exactextractr_ray.functions.codecs import sniff_media

    payload, _ = _avi_fixture(n_frames=1)
    assert sniff_media(payload) == "video/avi"
    rng = np.random.default_rng(9)
    g = encode_gif(rng.integers(0, 2, (4, 4, 3)).astype(np.uint8) * 255)
    assert sniff_media(g) == "image/gif"


def test_codec_decoder_gif_dispatch():
    from exactextractr_ray.functions.codecs import resize_nearest, to_grayscale
    from exactextractr_ray.stages.multimodal import CodecDecoder

    rng = np.random.default_rng(10)
    pal = rng.integers(0, 256, (4, 3), dtype=np.uint8)
    img = _pal_img(rng, pal, 30, 30)
    px = CodecDecoder(target_hw=(6, 6)).decode_one(encode_gif(img), 30, 30)
    want = resize_nearest(to_grayscale(img), (6, 6)).astype(np.float32)
    assert np.array_equal(px, want)


# ---------------- real video pipeline (fake=False) ----------------


def test_sample_frames_real_avi(ray_session):
    import ray.data

    from exactextractr_ray.functions.avi import decode_avi_frames
    from exactextractr_ray.functions.codecs import (
        resize_nearest,
        to_grayscale,
    )
    from exactextractr_ray.stages.multimodal import (
        sample_frames,
        synth_mjpeg_avi_table,
    )

    tbl = synth_mjpeg_avi_table(5, hw=(32, 48), n_frames=6, fps=12.0)
    ds = ray.data.from_arrow(tbl)
    out = (
        sample_frames(ds, k=3, target_hw=(8, 8), fake=False, batch_size=2)
        .to_pandas()
        .sort_values(["media_id", "frame_idx"])
        .reset_index(drop=True)
    )
    # 3 evenly spaced frames from 6 -> indices {0, 2(or 3), 5} per video
    assert len(out) == 15
    assert set(out["frame_idx"]) <= {0, 1, 2, 3, 4, 5}
    assert (out.groupby("media_id").size() == 3).all()
    # t_sec from the container fps
    row = out[(out.media_id == 0) & (out.frame_idx == 5)].iloc[0]
    assert abs(row["t_sec"] - 5 / 12.0) < 1e-9
    # spot-check pixels against a direct container decode
    payload = tbl.column("payload")[0].as_py()
    direct, _ = decode_avi_frames(payload, indices=[int(row["frame_idx"])])
    want = resize_nearest(to_grayscale(direct[0]), (8, 8)).astype(np.float32)
    got = np.asarray(row["pixels"], dtype=np.float32).reshape(8, 8)
    assert np.array_equal(got, want)


def test_sample_frames_real_gif(ray_session):
    import ray.data

    from exactextractr_ray.stages.multimodal import (
        sample_frames,
        synth_gif_video_table,
    )

    tbl = synth_gif_video_table(4, hw=(20, 28), n_frames=5)
    ds = ray.data.from_arrow(tbl)
    out = (
        sample_frames(ds, k=2, target_hw=(5, 7), fake=False, batch_size=2)
        .to_pandas()
    )
    assert len(out) == 8  # 2 frames x 4 animations
    assert set(out["frame_idx"]) == {0, 4}
    assert all(len(p) == 35 for p in out["pixels"])


def test_read_warc_media_end_to_end(tmp_path, ray_session):
    """Common-Crawl media path: WARC responses -> sniffed media rows ->
    real decode. Mixed payloads (PNG, JPEG, GIF, WAV, HTML) in one
    archive; only media rows survive, and each decodes."""
    from exactextractr_ray.functions.codecs import encode_png, encode_wav
    from exactextractr_ray.functions.jpeg import encode_jpeg
    from exactextractr_ray.sources.warc import read_warc_media, write_warc
    from exactextractr_ray.stages.multimodal import CodecDecoder

    rng = np.random.default_rng(41)
    png = encode_png(rng.integers(0, 256, (10, 10), dtype=np.uint8))
    jpg = encode_jpeg(
        rng.integers(0, 256, (12, 12), dtype=np.uint8), quality=90,
        subsampling="4:4:4")
    pal = rng.integers(0, 256, (4, 3), dtype=np.uint8)
    gif = encode_gif(pal[rng.integers(0, 4, (8, 8))])
    wav = encode_wav(np.zeros(100, np.float32))
    recs = [
        {"url": "http://a/x.png", "warc_ts": "2026-01-01T00:00:00Z",
         "html": png},
        {"url": "http://a/y.jpg", "warc_ts": "2026-01-01T00:00:00Z",
         "html": jpg},
        {"url": "http://a/z.gif", "warc_ts": "2026-01-01T00:00:00Z",
         "html": gif},
        {"url": "http://a/s.wav", "warc_ts": "2026-01-01T00:00:00Z",
         "html": wav},
        {"url": "http://a/page.html", "warc_ts": "2026-01-01T00:00:00Z",
         "html": b"<html>not media</html>"},
    ]
    p = str(tmp_path / "crawl.warc.gz")
    write_warc(p, recs, gzip_members=True)
    df = read_warc_media(p).to_pandas()
    assert len(df) == 4
    assert set(df["media_type"]) == {
        "image/png", "image/jpeg", "image/gif", "audio/wav"}
    # ids are stable across runs
    df2 = read_warc_media(p).to_pandas()
    assert sorted(df["media_id"]) == sorted(df2["media_id"])
    # every image row decodes through the real codec stage
    dec = CodecDecoder(target_hw=(5, 5))
    for _, row in df[df.media_type.str.startswith("image")].iterrows():
        px = dec.decode_one(row["payload"], 0, 0)
        assert px.shape == (5, 5)


def test_scene_cut_stats_real_decode(ray_session):
    """scene_cut_stats over real MJPEG-AVI decode: a hard content jump
    mid-video is flagged, within-scene frames are not."""
    import numpy as np
    import pyarrow as pa
    import ray

    from exactextractr_ray.functions.avi import encode_mjpeg_avi
    from exactextractr_ray.functions.jpeg import encode_jpeg
    from exactextractr_ray.stages.multimodal import scene_cut_stats

    hw = 16
    flat_a = np.full((hw, hw), 40, np.uint8)
    flat_b = np.full((hw, hw), 200, np.uint8)
    frames = [flat_a, flat_a, flat_a, flat_b, flat_b, flat_b]
    jpegs = [encode_jpeg(f, quality=95, subsampling="4:4:4")
             for f in frames]
    payload = encode_mjpeg_avi(jpegs, hw, hw, fps=5.0)
    tbl = pa.table({
        "media_id": pa.array([0], pa.int64()),
        "media_type": pa.array(["video/avi"]),
        "payload": pa.array([payload], pa.binary()),
        "width": pa.array([hw], pa.int32()),
        "height": pa.array([hw], pa.int32()),
        "n_frames": pa.array([len(frames)], pa.int32()),
        "fps": pa.array([5.0], pa.float32()),
    })
    out = scene_cut_stats(
        ray.data.from_arrow(tbl), k=len(frames), target_hw=(hw, hw),
        cut_threshold=2000, fake=False, concurrency=(1, 2),
    ).to_pandas().sort_values("frame_idx").reset_index(drop=True)
    assert len(out) == len(frames)
    # MJPEG is lossy but flat frames decode near-flat: only the jump cuts
    assert bool(out.loc[3, "is_cut"])
    assert not out.loc[[0, 1, 2, 4, 5], "is_cut"].any()
