"""CLI + plan-language + multimodal stage tests."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from exactextractr_ray import wkbio
from exactextractr_ray.grid import Grid
from exactextractr_ray.plan import parse_raster_descriptor, parse_stat_descriptor


def test_parse_raster_descriptor():
    d = parse_raster_descriptor("pop:data/tiles")
    assert (d.name, d.path, d.band) == ("pop", "data/tiles", None)
    d = parse_raster_descriptor("pop:data/tiles[weight]")
    assert d.band == "weight"
    d = parse_raster_descriptor("plain_path")
    assert d.name == "values" and d.path == "plain_path"


def test_parse_stat_descriptor():
    s = parse_stat_descriptor("mean")
    assert (s.name, s.stat, s.values, s.weights) == ("mean", "mean", None, None)
    s = parse_stat_descriptor("wsum=weighted_sum(pop,area)")
    assert (s.name, s.stat, s.values, s.weights) == (
        "wsum", "weighted_sum", "pop", "area",
    )
    with pytest.raises(ValueError):
        parse_stat_descriptor("x=mean(a,b,c)")


def test_cli_end_to_end(ray_session, tmp_path):
    from exactextractr_ray.cli import main
    from exactextractr_ray.sources.raster import (
        raster_from_array,
        write_raster_parquet,
    )
    from exactextractr_ray.sources.zones import zone_table

    g = Grid(0, 0, 8, 8, 1, 1)
    vals = np.arange(64, dtype=float).reshape(8, 8)
    rd = raster_from_array(vals, g, tile=4)
    tiles_dir = str(tmp_path / "tiles")
    write_raster_parquet(rd, tiles_dir)

    zones = zone_table(
        [
            (0, "a", wkbio.rect_wkb(0, 0, 4, 4)),
            (1, "b", wkbio.rect_wkb(4, 4, 8, 8)),
        ]
    )
    zpath = str(tmp_path / "zones.parquet")
    pq.write_table(zones, zpath)

    out = str(tmp_path / "out.parquet")
    rc = main(
        [
            "-p", zpath,
            "-r", f"values:{tiles_dir}",
            "-s", "mean",
            "-s", "total=sum(values)",
            "-o", out,
        ]
    )
    assert rc == 0
    res = pq.read_table(out).to_pandas().sort_values("zone_id")
    assert list(res.columns) == ["zone_id", "mean", "total"]
    assert res["mean"].iloc[0] == vals[4:, :4].mean()  # zone (0..4)^2 = bottom-left
    assert res["total"].iloc[1] == vals[:4, 4:].sum()

    # --strategy feature-sequential: same request, bit-identical output
    out2 = str(tmp_path / "out2.parquet")
    rc = main(
        [
            "-p", zpath,
            "-r", f"values:{tiles_dir}",
            "-s", "mean",
            "-s", "total=sum(values)",
            "-o", out2,
            "--strategy", "feature-sequential",
        ]
    )
    assert rc == 0
    res2 = pq.read_table(out2).to_pandas().sort_values("zone_id")
    pd.testing.assert_frame_equal(
        res.reset_index(drop=True), res2.reset_index(drop=True)
    )

    # --max-cells 1: the reference's max_cells_in_memory=1 equivalence
    # (tests/testthat/test_exact_extract.R:598-604) at the CLI level — every
    # zone-tile crop recursively splits down to single cells, result must be
    # bit-identical to the default bound
    out3 = str(tmp_path / "out3.parquet")
    rc = main(
        [
            "-p", zpath,
            "-r", f"values:{tiles_dir}",
            "-s", "mean",
            "-s", "total=sum(values)",
            "-o", out3,
            "--max-cells", "1",
        ]
    )
    assert rc == 0
    res3 = pq.read_table(out3).to_pandas().sort_values("zone_id")
    pd.testing.assert_frame_equal(
        res.reset_index(drop=True), res3.reset_index(drop=True)
    )


def test_multimodal_pipeline(ray_session):
    import ray.data
    from exactextractr_ray.stages.multimodal import (
        CodecDecoder,
        decode_images,
        image_features_batch,
        synth_image_table,
    )

    tbl = synth_image_table(40)
    ds = ray.data.from_arrow(tbl)
    decoded = decode_images(ds, target_hw=(16, 16), fake=True, batch_size=16)
    feats = decoded.map_batches(image_features_batch, batch_format="pyarrow")
    df = feats.to_pandas()
    assert len(df) == 40
    assert all(len(e) == 18 for e in df["embedding"])
    # determinism: same payload -> same embedding at any parallelism
    df2 = decode_images(
        ray.data.from_arrow(tbl).repartition(8), target_hw=(16, 16), batch_size=4
    ).map_batches(image_features_batch, batch_format="pyarrow").to_pandas()
    a = df.sort_values("media_id")["embedding"].tolist()
    b = df2.sort_values("media_id")["embedding"].tolist()
    assert all(np.array_equal(x, y) for x, y in zip(a, b))
    # the real-codec stage is an explicit stub
    with pytest.raises(NotImplementedError):
        CodecDecoder().decode_one(b"x", 4, 4)


def test_cli_cross_raster_weights(ray_session, tmp_path):
    """-s with weights naming ANOTHER raster descriptor routes through the
    mixed-grid (broadcast weight) path."""
    import numpy as np
    from exactextractr_ray.cli import main
    from exactextractr_ray.grid import Grid
    from exactextractr_ray.sources.raster import (
        raster_from_array,
        write_raster_parquet,
    )
    from exactextractr_ray.sources.zones import zone_table

    g = Grid(0, 0, 8, 8, 1, 1)
    vals = np.arange(64, dtype=float).reshape(8, 8)
    wts = np.ones((8, 8))
    wts[4:, :] = 3.0
    vdir, wdir = str(tmp_path / "v"), str(tmp_path / "w")
    write_raster_parquet(raster_from_array(vals, g, tile=4), vdir)
    write_raster_parquet(raster_from_array(wts, g, tile=4), wdir)

    zpath = str(tmp_path / "z.parquet")
    pq.write_table(zone_table([(0, "z", wkbio.rect_wkb(0, 0, 8, 8))]), zpath)
    out = str(tmp_path / "o.parquet")
    rc = main(
        [
            "-p", zpath,
            "-r", f"pop:{vdir}",
            "-r", f"wt:{wdir}",
            "-s", "wm=weighted_mean(pop,wt)",
            "-o", out,
        ]
    )
    assert rc == 0
    res = pq.read_table(out).to_pandas()
    expect = float((vals * wts).sum() / wts.sum())
    assert res["wm"].iloc[0] == pytest.approx(expect, rel=1e-12)


def test_video_frame_sampling(ray_session):
    import ray.data
    from exactextractr_ray.stages.multimodal import (
        FrameSampler,
        image_features_batch,
        sample_frames,
        synth_video_table,
    )

    tbl = synth_video_table(20)
    frames = sample_frames(ray.data.from_arrow(tbl), k=4, target_hw=(16, 16))
    df = frames.to_pandas()
    nf = tbl.column("n_frames").to_numpy()
    # each video yields min(k, n_frames) distinct frames, first at idx 0
    expect = int(np.minimum(nf, 4).sum())
    assert len(df) == expect
    assert (df.groupby("media_id")["frame_idx"].min() == 0).all()
    assert all(len(p) == 256 for p in df["pixels"])
    # frame tensors feed the image feature stage unchanged
    feats = frames.map_batches(image_features_batch, batch_format="pyarrow")
    fdf = feats.to_pandas()
    assert len(fdf) == expect and all(len(e) == 18 for e in fdf["embedding"])
    # determinism across parallelism
    df2 = sample_frames(
        ray.data.from_arrow(tbl).repartition(7), k=4, target_hw=(16, 16),
        batch_size=3,
    ).to_pandas()
    a = df.sort_values(["media_id", "frame_idx"]).reset_index(drop=True)
    b = df2.sort_values(["media_id", "frame_idx"]).reset_index(drop=True)
    assert all(np.array_equal(x, y) for x, y in zip(a["pixels"], b["pixels"]))
    # the real-codec path decodes MJPEG AVI / animated GIF; anything else
    # (here: an unknown container) is an explicit error, not a fake
    with pytest.raises(NotImplementedError):
        FrameSampler(fake=False)._real_frames(b"\x00" * 16)


def test_audio_features(ray_session):
    import ray.data
    from exactextractr_ray.stages.multimodal import (
        AudioFeatures,
        audio_features,
        synth_audio_table,
    )

    tbl = synth_audio_table(30)
    out = audio_features(ray.data.from_arrow(tbl), n_windows=8).to_pandas()
    assert len(out) == 30
    assert all(len(e) == 16 for e in out["embedding"])
    emb = np.stack(out.sort_values("media_id")["embedding"].to_numpy())
    # RMS of unit-normal fake waveforms ~ 1; zero-crossing rate ~ 0.5
    assert np.allclose(emb[:, :8].mean(), 1.0, atol=0.05)
    assert np.allclose(emb[:, 8:].mean(), 0.5, atol=0.05)
    # determinism across parallelism
    out2 = audio_features(
        ray.data.from_arrow(tbl).repartition(5), n_windows=8, batch_size=7
    ).to_pandas()
    emb2 = np.stack(out2.sort_values("media_id")["embedding"].to_numpy())
    assert np.array_equal(emb, emb2)
    with pytest.raises(NotImplementedError):
        AudioFeatures(fake=False).decode_waveform(b"x", 10)


def test_result_sinks_dbf_netcdf(ray_session, tmp_path):
    """GDALWriter sink analogs: .dbf and .nc outputs round-trip the result
    table exactly (ints, floats incl. NaN, strings)."""
    from exactextractr_ray.sources.sinks import (
        read_dbf,
        read_netcdf3,
        write_result,
    )

    df = pd.DataFrame(
        {
            "zone_id": np.arange(4, dtype=np.int64),
            "mean": np.array([0.5, np.nan, -3.75, 2.0e5]),
            "name": ["a", "bb", "ccc", "dddd"],
        }
    )
    p_dbf = str(tmp_path / "out.dbf")
    write_result(df, p_dbf)
    back = read_dbf(p_dbf)
    assert list(back["zone_id"]) == [0, 1, 2, 3]
    assert back["mean"][0] == 0.5 and np.isnan(back["mean"][1])
    assert list(back["name"]) == list(df["name"])

    p_nc = str(tmp_path / "out.nc")
    write_result(df, p_nc)
    nb = read_netcdf3(p_nc)
    np.testing.assert_allclose(
        nb["mean"].to_numpy(), df["mean"].to_numpy(), equal_nan=True
    )
    assert list(nb["name"]) == list(df["name"])


def test_shp_round_trip(tmp_path):
    """.shp/.shx writer round-trip (gdal_writer.cpp:26-143 analog): write a
    shapefile from WKB zones, read it back with our own .shp reader, and
    require geometric equality (ESRI ring orientation: shells CW, holes
    CCW; multipolygons flatten to multi-part records; None -> Null Shape)."""
    from exactextractr_ray.sources.sinks import read_dbf, read_shp, write_shp
    from exactextractr_ray.wkbio import (
        multipolygon_wkb,
        parse_wkb,
        polygon_wkb,
        rect_wkb,
    )

    hole = polygon_wkb(
        [(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)],
        holes=[[(4, 4), (6, 4), (6, 6), (4, 6), (4, 4)]],
    )
    geoms = [rect_wkb(0, 0, 4, 4), hole, None]
    df = pd.DataFrame(
        {"zone_id": np.arange(3, dtype=np.int64), "mean": [1.5, 2.5, np.nan]}
    )
    p = str(tmp_path / "zones_out.shp")
    write_shp(df, p, geoms)

    recs = read_shp(p)
    assert len(recs) == 3 and recs[2] == []
    # record 0: single CW ring equal to the rect (parser gives CCW shells)
    [part] = parse_wkb(geoms[0])
    np.testing.assert_array_equal(recs[0][0], part["rings"][0][::-1])
    # record 1: shell CW + hole CCW
    [part] = parse_wkb(geoms[1])
    assert len(recs[1]) == 2
    np.testing.assert_array_equal(recs[1][0], part["rings"][0][::-1])
    np.testing.assert_array_equal(recs[1][1], part["rings"][1][::-1])
    # sidecar files exist and the DBF carries the attributes
    assert (tmp_path / "zones_out.shx").exists()
    back = read_dbf(str(tmp_path / "zones_out.dbf"))
    assert list(back["zone_id"]) == [0, 1, 2]
    # header bbox covers both real shapes
    import struct as _struct

    with open(p, "rb") as f:
        hdr = f.read(100)
    xmin, ymin, xmax, ymax = _struct.unpack("<4d", hdr[36:68])
    assert (xmin, ymin, xmax, ymax) == (0.0, 0.0, 10.0, 10.0)


def test_cli_shp_output(ray_session, tmp_path):
    """CLI -o out.shp writes a complete shapefile (.shp/.shx/.dbf) whose
    geometry matches the input zones and whose DBF carries the stats."""
    from exactextractr_ray.cli import main
    from exactextractr_ray.sources.raster import (
        raster_from_array,
        write_raster_parquet,
    )
    from exactextractr_ray.sources.sinks import read_dbf, read_shp
    from exactextractr_ray.sources.zones import zone_table
    from exactextractr_ray.wkbio import parse_wkb

    g = Grid(0, 0, 8, 8, 1, 1)
    vals = np.arange(64, dtype=float).reshape(8, 8)
    tiles_dir = str(tmp_path / "tiles")
    write_raster_parquet(raster_from_array(vals, g, tile=4), tiles_dir)
    zwkb = [wkbio.rect_wkb(0, 0, 4, 4), wkbio.rect_wkb(4, 4, 8, 8)]
    zpath = str(tmp_path / "zones.parquet")
    pq.write_table(
        zone_table([(0, "a", zwkb[0]), (1, "b", zwkb[1])]), zpath
    )
    out = str(tmp_path / "out.shp")
    rc = main(["-p", zpath, "-r", f"values:{tiles_dir}", "-s", "mean", "-o", out])
    assert rc == 0
    res = read_dbf(str(tmp_path / "out.dbf"))
    assert res["mean"].iloc[0] == vals[4:, :4].mean()
    recs = read_shp(out)
    for rec, wkb in zip(recs, zwkb):
        [part] = parse_wkb(wkb)
        np.testing.assert_array_equal(rec[0], part["rings"][0][::-1])


def test_cli_dbf_output(ray_session, tmp_path):
    from exactextractr_ray.cli import main
    from exactextractr_ray.sources.raster import (
        raster_from_array,
        write_raster_parquet,
    )
    from exactextractr_ray.sources.sinks import read_dbf
    from exactextractr_ray.sources.zones import zone_table

    g = Grid(0, 0, 8, 8, 1, 1)
    vals = np.arange(64, dtype=float).reshape(8, 8)
    tiles_dir = str(tmp_path / "tiles")
    write_raster_parquet(raster_from_array(vals, g, tile=4), tiles_dir)
    zpath = str(tmp_path / "zones.parquet")
    pq.write_table(
        zone_table([(0, "a", wkbio.rect_wkb(0, 0, 4, 4))]), zpath
    )
    out = str(tmp_path / "out.dbf")
    rc = main(["-p", zpath, "-r", f"values:{tiles_dir}", "-s", "mean", "-o", out])
    assert rc == 0
    res = read_dbf(out)
    assert res["mean"].iloc[0] == vals[4:, :4].mean()


def test_cli_id_name_type(ray_session, tmp_path):
    """--id-name/--id-type rename and retype the id column
    (exactextract.cpp:57-59, 68-71: both-or-neither contract)."""
    from exactextractr_ray.cli import main
    from exactextractr_ray.sources.raster import (
        raster_from_array,
        write_raster_parquet,
    )
    from exactextractr_ray.sources.zones import zone_table

    g = Grid(0, 0, 8, 8, 1, 1)
    rd = raster_from_array(np.ones((8, 8)), g, tile=4)
    tiles_dir = str(tmp_path / "tiles")
    write_raster_parquet(rd, tiles_dir)
    zpath = str(tmp_path / "zones.parquet")
    pq.write_table(
        zone_table([(7, "z", wkbio.rect_wkb(0, 0, 8, 8))]), zpath
    )

    out = str(tmp_path / "out.parquet")
    rc = main(
        [
            "-p", zpath, "-r", f"values:{tiles_dir}", "-s", "mean",
            "-o", out, "--id-name", "fid", "--id-type", "string",
        ]
    )
    assert rc in (0, None)
    t = pq.read_table(out).to_pandas()
    assert list(t.columns)[0:1] == ["fid"] or "fid" in t.columns
    assert t["fid"].iloc[0] == "7"

    # one without the other -> error exit, like the reference
    rc2 = main(
        [
            "-p", zpath, "-r", f"values:{tiles_dir}", "-s", "mean",
            "-o", out, "--id-name", "fid",
        ]
    )
    assert rc2 == 1


def test_cli_sqlite_output(ray_session, tmp_path):
    """CLI -o out.db writes a SQLite results table (the GDALWriter database
    sink, gdal_writer.cpp:26-143, with SQLite standing in for PostgreSQL)."""
    from exactextractr_ray.cli import main
    from exactextractr_ray.sources.raster import (
        raster_from_array,
        write_raster_parquet,
    )
    from exactextractr_ray.sources.sinks import read_sqlite
    from exactextractr_ray.sources.zones import zone_table

    g = Grid(0, 0, 8, 8, 1, 1)
    vals = np.arange(64, dtype=float).reshape(8, 8)
    tiles_dir = str(tmp_path / "tiles")
    write_raster_parquet(raster_from_array(vals, g, tile=4), tiles_dir)
    zpath = str(tmp_path / "zones.parquet")
    pq.write_table(
        zone_table([(0, "a", wkbio.rect_wkb(0, 0, 4, 4)),
                    (1, "b", wkbio.rect_wkb(4, 4, 8, 8))]), zpath
    )
    out = str(tmp_path / "out.db")
    rc = main(["-p", zpath, "-r", f"values:{tiles_dir}", "-s", "mean",
               "-s", "sum", "-o", out])
    assert rc == 0
    res = read_sqlite(out).sort_values("zone_id").reset_index(drop=True)
    assert res["mean"].iloc[0] == vals[4:, :4].mean()
    assert res["sum"].iloc[1] == vals[:4, 4:].sum()
    assert list(res.columns) == ["zone_id", "mean", "sum"]


def test_cli_gpkg_output_roundtrip(ray_session, tmp_path):
    """CLI -o out.gpkg writes a GeoPackage this engine's own gpkg reader
    can load back: geometry survives byte-exactly and attributes match."""
    from exactextractr_ray.cli import main
    from exactextractr_ray.sources.gpkg import read_gpkg_zones
    from exactextractr_ray.sources.raster import (
        raster_from_array,
        write_raster_parquet,
    )
    from exactextractr_ray.sources.zones import zone_table

    g = Grid(0, 0, 8, 8, 1, 1)
    vals = np.arange(64, dtype=float).reshape(8, 8)
    tiles_dir = str(tmp_path / "tiles")
    write_raster_parquet(raster_from_array(vals, g, tile=4), tiles_dir)
    zwkb = [wkbio.rect_wkb(0, 0, 4, 4), wkbio.rect_wkb(4, 4, 8, 8)]
    zpath = str(tmp_path / "zones.parquet")
    pq.write_table(
        zone_table([(0, "a", zwkb[0]), (1, "b", zwkb[1])]), zpath
    )
    out = str(tmp_path / "out.gpkg")
    rc = main(["-p", zpath, "-r", f"values:{tiles_dir}", "-s", "mean", "-o", out])
    assert rc == 0

    back = read_gpkg_zones(out, layer="results")
    got_wkb = back.column("geom_wkb").to_pylist()
    assert got_wkb == zwkb  # byte-exact WKB round-trip

    import sqlite3

    con = sqlite3.connect(out)
    try:
        rows = con.execute(
            'SELECT zone_id, mean FROM "results" ORDER BY zone_id'
        ).fetchall()
        assert rows[0][1] == vals[4:, :4].mean()
        assert rows[1][1] == vals[:4, 4:].mean()
        # registry rows present (GPKG core)
        assert con.execute(
            "SELECT data_type FROM gpkg_contents WHERE table_name='results'"
        ).fetchone()[0] == "features"
        assert con.execute(
            "SELECT column_name FROM gpkg_geometry_columns "
            "WHERE table_name='results'"
        ).fetchone()[0] == "geom"
        assert con.execute("PRAGMA application_id").fetchone()[0] == 0x47504B47
    finally:
        con.close()


def test_cli_file_format_rasters_and_shp_zones(ray_session, tmp_path):
    """CLI ingests GeoTIFF / NetCDF / ASCII-grid rasters and shapefile /
    GeoPackage zones directly (the reference CLI's GDAL-path surface),
    producing identical results across all raster formats and both
    physical strategies."""
    from exactextractr_ray.cli import main
    from exactextractr_ray.grid import Grid as _G
    from exactextractr_ray.sources.ascii_grid import write_ascii_grid
    from exactextractr_ray.sources.geotiff import write_geotiff
    from exactextractr_ray.sources.netcdf_raster import write_netcdf_raster
    from exactextractr_ray.sources.sinks import write_shp
    from exactextractr_ray.sources.zones import zone_table

    g = _G(0, 0, 8, 8, 1, 1)
    vals = np.arange(64, dtype=float).reshape(8, 8)
    tif, nc, asc = (str(tmp_path / f"r.{e}") for e in ("tif", "nc", "asc"))
    write_geotiff(vals, g, tif)
    write_netcdf_raster(vals, g, nc)
    write_ascii_grid(vals, g, asc)

    zwkb = [wkbio.rect_wkb(0, 0, 4, 4), wkbio.rect_wkb(4, 4, 8, 8)]
    zpq = str(tmp_path / "zones.parquet")
    pq.write_table(zone_table([(0, "a", zwkb[0]), (1, "b", zwkb[1])]), zpq)
    zshp = str(tmp_path / "zones.shp")
    write_shp(pd.DataFrame({"zone_id": [0, 1], "name": ["a", "b"]}),
              zshp, zwkb)

    outs = []
    for i, rp in enumerate([tif, nc, asc]):
        out = str(tmp_path / f"o{i}.parquet")
        rc = main(["-p", zpq, "-r", f"values:{rp}", "-s", "mean",
                   "-s", "sum", "-o", out])
        assert rc == 0
        outs.append(
            pq.read_table(out).to_pandas().sort_values("zone_id")
            .reset_index(drop=True)
        )
    for o in outs[1:]:
        pd.testing.assert_frame_equal(o, outs[0])
    assert outs[0]["mean"].iloc[0] == vals[4:, :4].mean()

    # shapefile zones + feature-sequential over a GeoTIFF (tempdir convert)
    out2 = str(tmp_path / "o_fs.parquet")
    rc = main(["-p", zshp, "-r", f"values:{tif}", "-s", "mean", "-o", out2,
               "--strategy", "feature-sequential"])
    assert rc == 0
    fs = pq.read_table(out2).to_pandas().sort_values("zone_id").reset_index(
        drop=True
    )
    pd.testing.assert_frame_equal(
        fs[["zone_id", "mean"]], outs[0][["zone_id", "mean"]]
    )


def test_cli_sao_miguel_real_assets(ray_session, tmp_path):
    """Full reference workflow through the CLI on the reference's OWN
    assets: GeoPackage concelhos + GPW population-count GeoTIFF, as a
    user of the reference CLI would run it. Validates against the same
    facts as the vignette (every concelho inhabited; Ponta Delgada the
    largest by population sum)."""
    import os

    from exactextractr_ray.cli import main

    SM = "/root/reference/inst/sao_miguel"
    if not os.path.exists(f"{SM}/concelhos.gpkg"):
        import pytest as _pt

        _pt.skip("reference assets unavailable")
    out = str(tmp_path / "pop.parquet")
    rc = main([
        "-p", f"{SM}/concelhos.gpkg",
        "-r", f"pop:{SM}/gpw_v411_2020_count_2020.tif",
        "-s", "total=sum(pop)", "-s", "n=count(pop)",
        "-o", out,
    ])
    assert rc == 0
    res = pq.read_table(out).to_pandas()
    assert len(res) == 6
    assert (res["total"] > 1000).all()
    from exactextractr_ray.sources.gpkg import read_gpkg_zones

    names = read_gpkg_zones(f"{SM}/concelhos.gpkg").to_pandas()
    merged = res.merge(names[["zone_id", "name"]], on="zone_id")
    assert merged.loc[merged["total"].idxmax(), "name"] == "Ponta Delgada"


def test_cli_envi_raster(ray_session, tmp_path):
    """CLI auto-detects an ENVI binary by its .hdr sidecar and matches the
    parquet-tile result."""
    from exactextractr_ray.cli import main
    from exactextractr_ray.sources.envi import write_envi
    from exactextractr_ray.sources.zones import zone_table

    g = Grid(0, 0, 8, 8, 1, 1)
    vals = np.arange(64, dtype=float).reshape(8, 8)
    img = str(tmp_path / "r.img")
    write_envi(vals, g, img)
    zpath = str(tmp_path / "zones.parquet")
    pq.write_table(
        zone_table([(0, "a", wkbio.rect_wkb(0, 0, 4, 4))]), zpath
    )
    out = str(tmp_path / "o.parquet")
    rc = main(["-p", zpath, "-r", f"values:{img}", "-s", "mean", "-o", out])
    assert rc == 0
    res = pq.read_table(out).to_pandas()
    assert res["mean"].iloc[0] == vals[4:, :4].mean()


def test_cli_terrain_geotiff_end_to_end(ray_session, tmp_path):
    """terrain subcommand: real GeoTIFF in -> hillshade GeoTIFF out,
    byte-equal to the library path; slope parquet output streams."""
    import numpy as np

    from exactextractr_ray import synth
    from exactextractr_ray.cli import main
    from exactextractr_ray.grid import Grid
    from exactextractr_ray.pipelines.focal import terrain_3x3
    from exactextractr_ray.sources.geotiff import read_geotiff, write_geotiff
    from exactextractr_ray.sources.raster import raster_from_array

    n = 48
    r, c = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    vals = synth.synth_values(r, c)
    g = Grid(0.0, 0.0, float(n), float(n), 1.0, 1.0)
    dem = tmp_path / "dem.tif"
    write_geotiff(np.where(np.isnan(vals), -9999.0, vals), g, str(dem),
                  nodata=None)
    # -9999 is a plain value here; mask via nodata on read is not the
    # point — regenerate with NaN handling through the nodata arg instead
    write_geotiff(vals, g, str(dem), nodata=-9999.0)

    out_tif = tmp_path / "hs.tif"
    rc = main(["terrain", "-r", str(dem), "--op", "hillshade",
               "-o", str(out_tif), "--tile", "16"])
    assert rc == 0
    got, meta = read_geotiff(str(out_tif))
    assert got.shape == (n, n)

    rd = raster_from_array(vals, g, tile=16)
    want = (
        terrain_3x3(rd)
        .to_pandas()
        .sort_values("cell")["hillshade"]
        .to_numpy()
        .reshape(n, n)
    )
    gm = got.astype(np.float64)  # nodata already NaN on read
    assert np.array_equal(np.isnan(gm), np.isnan(want))
    m = ~np.isnan(want)
    assert np.array_equal(gm[m], want[m])

    out_pq = tmp_path / "slope.parquet"
    rc = main(["terrain", "-r", str(dem), "--op", "slope",
               "-o", str(out_pq), "--tile", "16"])
    assert rc == 0
    import duckdb

    cnt, vmax = duckdb.connect().execute(
        f"SELECT COUNT(*), MAX(CASE WHEN isnan(slope_num) THEN NULL ELSE slope_num END) FROM read_parquet('{out_pq}/*.parquet')"
    ).fetchone()
    assert cnt == n * n
    assert 0.0 < vmax < 90.0  # degrees


def test_pgsql_script_sink_roundtrip(tmp_path):
    """PostgreSQL COPY-script sink (the GDAL PG-driver target as an
    offline replayable artifact): CREATE TABLE + documented COPY text
    format with full escaping, terminated by backslash-dot; the bundled
    reader reverses every escape."""
    import numpy as np
    import pandas as pd

    from exactextractr_ray.sources.sinks import (
        read_pgsql_script,
        write_pgsql_script,
        write_result,
    )

    df = pd.DataFrame({
        "zone_id": pd.array([1, 2, 3], dtype="int64"),
        "mean": [1.5, np.nan, -2.25],
        "name": ["plain", "has\ttab and \\backslash", "multi\nline\rret"],
        "flag": pd.array([True, False, None], dtype="boolean"),
    })
    geoms = [b"\x01\x02\x00", b"", b"\xff\xfe"]
    p = str(tmp_path / "zonal.pgsql")
    write_pgsql_script(df, p, table="zonal results", geoms=geoms)
    text = open(p).read()
    assert 'CREATE TABLE IF NOT EXISTS "zonal results"' in text
    assert "DOUBLE PRECISION" in text and "BYTEA" in text
    assert text.rstrip().endswith("\\.")
    assert "\\N" in text  # NULLs in COPY text form
    back = read_pgsql_script(p)
    assert back.loc[1, "mean"] is None
    assert back.loc[1, "name"] == "has\ttab and \\backslash"
    assert back.loc[2, "name"] == "multi\nline\rret"
    assert back.loc[0, "geom_wkb"] == b"\x01\x02\x00"
    assert back.loc[2, "geom_wkb"] == b"\xff\xfe"
    assert back.loc[0, "flag"] == "t" and back.loc[2, "flag"] is None
    # extension dispatch through the CLI's write_result
    p2 = str(tmp_path / "res.pgsql")
    write_result(df[["zone_id", "mean"]], p2)
    assert "COPY" in open(p2).read()
