"""GeoTIFF + GeoPackage ingestion against the reference's REAL test assets
(inst/sao_miguel), ending in the population vignette's own reconciliation
check (vignettes/vig1_population.Rmd:186-189)."""

import struct
import zlib

import numpy as np
import pytest

SM = "/root/reference/inst/sao_miguel"


@pytest.fixture(scope="module")
def _ray(ray_session):
    return None


def test_read_gpw_population():
    from exactextractr_ray.sources.geotiff import read_geotiff

    arr, meta = read_geotiff(f"{SM}/gpw_v411_2020_count_2020.tif")
    assert arr.shape == (48, 96)
    assert meta.grid.dx == pytest.approx(0.00833333333, rel=1e-6)
    # São Miguel's population is ~140k; nodata became NaN
    total = np.nansum(arr)
    assert 120_000 < total < 180_000
    assert np.isnan(arr).any()


def test_read_landcover_and_dem():
    from exactextractr_ray.sources.geotiff import read_geotiff

    clc, m1 = read_geotiff(f"{SM}/clc2018_v2020_20u1.tif")
    assert clc.shape == (1920, 3840)
    codes = np.unique(clc[np.isfinite(clc)])
    assert codes.min() >= 0 and codes.max() <= 255
    dem, m2 = read_geotiff(f"{SM}/eu_dem_v11.tif")
    vals = dem[np.isfinite(dem)]
    assert 0 < vals.mean() < 1500  # island elevations
    # the two rasters cover the same extent at different resolutions
    assert m1.grid.xmin == pytest.approx(m2.grid.xmin)
    assert m1.grid.ymax == pytest.approx(m2.grid.ymax)


def test_read_concelhos_gpkg():
    from exactextractr_ray.sources.gpkg import gpkg_srs, read_gpkg_zones
    from exactextractr_ray import wkbio

    zones = read_gpkg_zones(f"{SM}/concelhos.gpkg")
    assert zones.num_rows == 6
    assert "Ponta Delgada" in zones.column("name").to_pylist()
    assert gpkg_srs(f"{SM}/concelhos.gpkg") == "EPSG:4326"
    for wkb in zones.column("geom_wkb").to_pylist():
        parts = wkbio.parse_wkb(wkb)  # GPKG blob -> standard WKB parses
        assert len(parts) >= 1


def test_sao_miguel_population_reconciliation(_ray):
    """The vignette's own correctness gate, reproduced exactly
    (vig1_population.Rmd:166-189): population = density x coverage_fraction
    x cell area via the weighted-UDF path with the spherical area raster as
    weights, summed over the six concelhos, must reconcile with the count
    raster's total to < 1% (stopifnot(missing_pop_pct < 1))."""
    from exactextractr_ray.pipelines.zonal import exact_extract, exact_extract_apply
    from exactextractr_ray.sources.geotiff import read_geotiff
    from exactextractr_ray.sources.gpkg import read_gpkg_zones
    from exactextractr_ray.sources.raster import raster_from_array
    import pandas as pd

    cnt, _ = read_geotiff(f"{SM}/gpw_v411_2020_count_2020.tif")
    sao_miguel_pop = float(np.nansum(cnt))  # the vignette's cellStats total
    den, meta = read_geotiff(f"{SM}/gpw_v411_2020_density_2020.tif")
    zones = read_gpkg_zones(f"{SM}/concelhos.gpkg")
    rd = raster_from_array(den, meta.grid, tile=16)

    def pop_from_density(density, frac, area):
        # density is persons/km^2; engine cell areas are m^2
        return pd.DataFrame(
            {"result": [float(np.nansum(density * frac * area / 1e6))]}
        )

    res = exact_extract_apply(
        rd, zones, pop_from_density,
        weight_layer="area", area_method="spherical",
    ).to_pandas()
    assert len(res) == 6
    missing_pop_pct = 100.0 * (sao_miguel_pop - res["result"].sum()) / sao_miguel_pop
    assert abs(missing_pop_pct) < 1.0

    # the count raster direct 'sum' is also sane: every concelho inhabited,
    # Ponta Delgada the largest (the vignette's table ordering)
    rc = raster_from_array(cnt, meta.grid, tile=16)
    direct = exact_extract(rc, zones, ["sum"]).to_pandas()
    assert (direct["sum"] > 1000).all()
    names = zones.to_pandas()["name"]
    assert names[int(direct["sum"].idxmax())] == "Ponta Delgada"


def test_sao_miguel_mean_elevation(_ray):
    """Real multipolygons x real DEM through the full pipeline."""
    from exactextractr_ray.pipelines.zonal import exact_extract
    from exactextractr_ray.sources.geotiff import read_geotiff
    from exactextractr_ray.sources.gpkg import read_gpkg_zones
    from exactextractr_ray.sources.raster import raster_from_array

    dem, meta = read_geotiff(f"{SM}/eu_dem_v11.tif")
    zones = read_gpkg_zones(f"{SM}/concelhos.gpkg")
    rd = raster_from_array(dem, meta.grid, tile=64)
    res = exact_extract(rd, zones, ["mean", "max"]).to_pandas()
    assert (res["mean"] > 0).all()
    # Nordeste contains Pico da Vara (~1100 m)
    nord = res[zones.to_pandas()["name"] == "Nordeste"]
    assert float(nord["max"].iloc[0]) > 900


def _write_tiff(path, arr, *, tiled=False, compression=1, predictor=1,
                endian="<", bigtiff=False):
    """Minimal single-band TIFF writer for decoder tests (uncompressed /
    deflate, strip / tile, horizontal or floating-point predictor, classic
    or BigTIFF container)."""
    h, w = arr.shape
    dt = arr.dtype
    fmt_code = {"u": 1, "i": 2, "f": 3}[dt.kind]
    if predictor == 2:
        p = arr.view(f"u{dt.itemsize}").astype(np.int64)
        d = np.diff(p, axis=1)
        payload = np.concatenate([p[:, :1], d], axis=1).astype(
            f"u{dt.itemsize}"
        ).view(dt)
        body = payload.astype(dt.newbyteorder(endian)).tobytes()
    elif predictor == 3:
        # TIFF TN3: big-endian byte planes per row (msb plane first), then
        # byte-level differencing — independent of container endianness
        s = dt.itemsize
        be = np.frombuffer(
            arr.astype(f">f{s}").tobytes(), np.uint8
        ).reshape(h, w, s)
        planes = np.transpose(be, (0, 2, 1)).reshape(h, w * s)
        d = np.diff(planes.astype(np.int64), axis=1)
        body = (
            np.concatenate([planes[:, :1].astype(np.int64), d], axis=1)
            .astype(np.uint8)
            .tobytes()
        )
    else:
        body = arr.astype(dt.newbyteorder(endian)).tobytes()
    if compression == 8:
        body = zlib.compress(body)
    data_off = 16 if bigtiff else 8
    tags = []

    def tag(tid, typ, cnt, val):
        tags.append((tid, typ, cnt, val))

    tag(256, 4, 1, w)
    tag(257, 4, 1, h)
    tag(258, 3, 1, dt.itemsize * 8)
    tag(259, 3, 1, compression)
    tag(262, 3, 1, 1)
    tag(277, 3, 1, 1)
    tag(317, 3, 1, predictor)
    tag(339, 3, 1, fmt_code)
    if tiled:
        tag(322, 4, 1, w)
        tag(323, 4, 1, h)
        tag(324, 16 if bigtiff else 4, 1, data_off)
        tag(325, 4, 1, len(body))
    else:
        tag(273, 16 if bigtiff else 4, 1, data_off)
        tag(278, 4, 1, h)
        tag(279, 4, 1, len(body))
    # georeferencing: unit grid at origin
    extra = b""
    ifd_off = data_off + len(body)
    if bigtiff:
        extra_off = ifd_off + 8 + 20 * (len(tags) + 2) + 8
    else:
        extra_off = ifd_off + 2 + 12 * (len(tags) + 2) + 4
    scale = struct.pack(endian + "ddd", 1.0, 1.0, 0.0)
    tie = struct.pack(endian + "dddddd", 0, 0, 0, 0.0, float(h), 0.0)
    tag(33550, 12, 3, extra_off)
    extra += scale
    tag(33922, 12, 6, extra_off + len(scale))
    extra += tie
    out = bytearray()
    out += (b"II" if endian == "<" else b"MM")
    if bigtiff:
        out += struct.pack(endian + "HHHQ", 43, 8, 0, ifd_off)
    else:
        out += struct.pack(endian + "HI", 42, ifd_off)
    out += body
    inline = 8 if bigtiff else 4
    if bigtiff:
        out += struct.pack(endian + "Q", len(tags))
    else:
        out += struct.pack(endian + "H", len(tags))
    for tid, typ, cnt, val in sorted(tags):
        sz = {3: 2, 4: 4, 12: 8, 16: 8}[typ] * cnt
        if sz <= inline:
            raw = struct.pack(
                endian + {3: "H", 4: "I", 12: "d", 16: "Q"}[typ] * cnt,
                *([val] if cnt == 1 else val),
            )
            raw = raw.ljust(inline, b"\x00")
        else:
            raw = struct.pack(endian + ("Q" if bigtiff else "I"), val)
        if bigtiff:
            out += struct.pack(endian + "HHQ", tid, typ, cnt) + raw
        else:
            out += struct.pack(endian + "HHI", tid, typ, cnt) + raw
    out += struct.pack(endian + ("Q" if bigtiff else "I"), 0)
    out += extra
    with open(path, "wb") as f:
        f.write(out)


@pytest.mark.parametrize("tiled", [False, True])
@pytest.mark.parametrize("compression", [1, 8])
@pytest.mark.parametrize("endian", ["<", ">"])
def test_tiff_reader_variants(tmp_path, tiled, compression, endian):
    from exactextractr_ray.sources.geotiff import read_geotiff

    rng = np.random.default_rng(5)
    arr = rng.integers(0, 1000, (13, 17)).astype(np.float32)
    p = str(tmp_path / "t.tif")
    _write_tiff(p, arr, tiled=tiled, compression=compression, endian=endian)
    got, meta = read_geotiff(p)
    np.testing.assert_array_equal(got, arr.astype(np.float64))
    assert meta.grid.dx == 1.0 and meta.grid.ymax == 13.0


def test_tiff_predictor2_uint16(tmp_path):
    from exactextractr_ray.sources.geotiff import read_geotiff

    rng = np.random.default_rng(6)
    arr = rng.integers(0, 60000, (9, 21)).astype(np.uint16)
    p = str(tmp_path / "p.tif")
    _write_tiff(p, arr, compression=8, predictor=2)
    got, _ = read_geotiff(p)
    np.testing.assert_array_equal(got, arr.astype(np.float64))


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
@pytest.mark.parametrize("tiled", [False, True])
def test_tiff_predictor3_float(tmp_path, dtype, tiled):
    """Floating-point predictor (TIFF TN3, predictor 3): byte-plane split +
    byte differencing, bit-exact round trip for f32 and f64."""
    from exactextractr_ray.sources.geotiff import read_geotiff

    rng = np.random.default_rng(7)
    arr = (rng.normal(0, 1e6, (11, 19))).astype(dtype)
    p = str(tmp_path / "p3.tif")
    _write_tiff(p, arr, compression=8, predictor=3, tiled=tiled)
    got, _ = read_geotiff(p)
    np.testing.assert_array_equal(got, arr.astype(np.float64))


@pytest.mark.parametrize("endian", ["<", ">"])
@pytest.mark.parametrize("tiled", [False, True])
def test_bigtiff_round_trip(tmp_path, endian, tiled):
    """BigTIFF container (magic 43, 8-byte offsets, 20-byte IFD entries)
    reads identically to classic TIFF."""
    from exactextractr_ray.sources.geotiff import read_geotiff

    rng = np.random.default_rng(8)
    arr = rng.integers(0, 1000, (13, 17)).astype(np.float32)
    p = str(tmp_path / "big.tif")
    _write_tiff(p, arr, tiled=tiled, endian=endian, bigtiff=True)
    got, meta = read_geotiff(p)
    np.testing.assert_array_equal(got, arr.astype(np.float64))
    assert meta.grid.dx == 1.0 and meta.grid.ymax == 13.0


def test_bigtiff_predictor3_combined(tmp_path):
    from exactextractr_ray.sources.geotiff import read_geotiff

    rng = np.random.default_rng(9)
    arr = rng.normal(size=(8, 12)).astype(np.float32)
    p = str(tmp_path / "bp3.tif")
    _write_tiff(p, arr, compression=8, predictor=3, bigtiff=True)
    got, _ = read_geotiff(p)
    np.testing.assert_array_equal(got, arr.astype(np.float64))


def _lzw_encode(data: bytes) -> bytes:
    """Minimal TIFF LZW encoder (MSB-first, early-change) for decoder tests."""
    CLEAR, EOI = 256, 257
    out_bits: list[tuple[int, int]] = []  # (code, width)
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    out_bits.append((CLEAR, width))
    w = b""
    for ch in data:
        c = bytes([ch])
        if w + c in table:
            w += c
            continue
        out_bits.append((table[w], width))
        table[w + c] = next_code
        next_code += 1
        # TIFF early change: widen when next_code reaches 2^width - 1
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        if next_code >= 4094:  # table nearly full: emit CLEAR, reset
            out_bits.append((CLEAR, width))
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        w = c
    if w:
        out_bits.append((table[w], width))
    out_bits.append((EOI, width))
    acc = 0
    bits = 0
    out = bytearray()
    for code, wd in out_bits:
        acc = (acc << wd) | code
        bits += wd
        while bits >= 8:
            out.append((acc >> (bits - 8)) & 0xFF)
            bits -= 8
    if bits:
        out.append((acc << (8 - bits)) & 0xFF)
    return bytes(out)


def _packbits_encode(data: bytes) -> bytes:
    """Naive PackBits: literal runs only (valid encoding)."""
    out = bytearray()
    i = 0
    while i < len(data):
        chunk = data[i : i + 128]
        out.append(len(chunk) - 1)
        out.extend(chunk)
        i += len(chunk)
    return bytes(out)


def test_lzw_and_packbits_decoders():
    from exactextractr_ray.sources.geotiff import _decode_lzw, _decode_packbits

    rng = np.random.default_rng(9)
    for n in (1, 17, 1000, 20000):
        # compressible data (small alphabet) exercises table growth + CLEAR
        data = bytes(rng.integers(0, 7, n, dtype=np.uint8))
        assert _decode_lzw(_lzw_encode(data)) == data
        assert _decode_packbits(_packbits_encode(data)) == data
    # repeated-run packbits form
    assert _decode_packbits(bytes([257 - 5, 42])) == bytes([42] * 5)


def test_geotiff_to_cli_end_to_end(_ray, tmp_path):
    """Full ingestion seam: real GeoTIFF -> tile-parquet, real GPKG zones ->
    parquet, then the CLI computes the same means as the library path."""
    import pyarrow.parquet as pq

    from exactextractr_ray.cli import main
    from exactextractr_ray.pipelines.zonal import exact_extract
    from exactextractr_ray.sources.geotiff import (
        geotiff_raster_dataset,
        geotiff_to_tile_parquet,
    )
    from exactextractr_ray.sources.gpkg import read_gpkg_zones
    from exactextractr_ray.sources.sinks import read_dbf

    tiles = str(tmp_path / "dem_tiles")
    geotiff_to_tile_parquet(f"{SM}/eu_dem_v11.tif", tiles, tile=64)
    zones = read_gpkg_zones(f"{SM}/concelhos.gpkg")
    zpath = str(tmp_path / "zones.parquet")
    pq.write_table(zones, zpath)

    out = str(tmp_path / "elev.dbf")
    rc = main(["-p", zpath, "-r", f"dem:{tiles}", "-s", "mean", "-o", out])
    assert rc == 0
    got = read_dbf(out).sort_values("zone_id").reset_index(drop=True)

    ref = exact_extract(
        geotiff_raster_dataset(f"{SM}/eu_dem_v11.tif", tile=64), zones, ["mean"]
    ).to_pandas().sort_values("zone_id").reset_index(drop=True)
    np.testing.assert_allclose(
        got["mean"].to_numpy(), ref["mean"].to_numpy(), rtol=1e-6
    )  # DBF carries 6 decimals


@pytest.mark.parametrize("dtype", [np.float32, np.float64, np.int32, np.uint16])
@pytest.mark.parametrize("compression", [1, 8])
def test_geotiff_writer_round_trip(tmp_path, dtype, compression):
    """write_geotiff -> read_geotiff is bit-exact (values, grid, nodata)."""
    from exactextractr_ray.grid import Grid
    from exactextractr_ray.sources.geotiff import read_geotiff, write_geotiff

    rng = np.random.default_rng(11)
    if np.issubdtype(dtype, np.floating):
        arr = rng.normal(0, 100, (9, 14)).astype(dtype)
        arr[2, 3] = np.nan
        nodata = -9999.0
    else:
        arr = rng.integers(1, 1000, (9, 14)).astype(dtype)
        nodata = 0.0
    g = Grid(10.0, -5.0, 10.0 + 14 * 0.5, -5.0 + 9 * 0.25, 0.5, 0.25)
    p = str(tmp_path / "w.tif")
    write_geotiff(arr, g, p, nodata=nodata, compression=compression)
    got, meta = read_geotiff(p)
    exp = arr.astype(np.float64)
    if np.issubdtype(dtype, np.floating):
        exp = np.where(np.isnan(arr), np.nan, exp)  # nodata -> NaN again
    np.testing.assert_array_equal(got, exp)
    assert meta.nodata == nodata
    assert (meta.grid.xmin, meta.grid.ymax) == (g.xmin, g.ymax)
    assert (meta.grid.dx, meta.grid.dy) == (g.dx, g.dy)


def test_geotiff_writer_rasterize_output(_ray, tmp_path):
    """A pipeline raster result (rasterize) lands in a real GeoTIFF and
    reads back identically — the GDAL raster-output sink analog."""
    from exactextractr_ray import wkbio
    from exactextractr_ray.grid import Grid
    from exactextractr_ray.pipelines.rasterize import rasterize_polygons
    from exactextractr_ray.sources.geotiff import read_geotiff, write_geotiff
    from exactextractr_ray.sources.zones import zone_table

    g = Grid(0, 0, 8, 8, 1, 1)
    zones = zone_table(
        [
            (1, "a", wkbio.rect_wkb(0, 0, 4, 8)),
            (2, "b", wkbio.rect_wkb(4, 0, 8, 8)),
        ]
    )
    zone_ids = np.array([1, 2], dtype=np.int32)
    arr = np.full((8, 8), np.nan)
    for r in rasterize_polygons(zones, g, tile=4).to_pandas().itertuples():
        zi = np.asarray(r.zone_index, dtype=np.int32).reshape(r.th, r.tw)
        block = np.where(zi >= 0, zone_ids[np.clip(zi, 0, None)], np.nan)
        arr[r.row0 : r.row0 + r.th, r.col0 : r.col0 + r.tw] = block
    p = str(tmp_path / "rasterized.tif")
    write_geotiff(arr, g, p, nodata=-1.0)
    got, meta = read_geotiff(p)
    np.testing.assert_array_equal(got, arr)
    assert meta.nodata == -1.0


def test_zstd_roundtrip():
    """ZSTD-compressed GeoTIFF (registered TIFF code 50000, the COG-era
    compression GDAL writes with COMPRESS=ZSTD) round-trips bit-exactly."""
    import numpy as np

    from exactextractr_ray.grid import Grid
    from exactextractr_ray.sources.geotiff import read_geotiff, write_geotiff

    g = Grid(10.0, -5.0, 74.0, 43.0, 1.0, 1.0)
    rng = np.random.default_rng(5)
    a = rng.normal(size=(48, 64)).astype(np.float32)
    a[3, 5] = np.nan
    p = "/tmp/test_zstd.tif"
    write_geotiff(a, g, p, nodata=-9999.0, compression=50000)
    r, m = read_geotiff(p)
    exp = a.astype(np.float64)
    np.testing.assert_array_equal(np.isnan(r), np.isnan(exp))
    np.testing.assert_array_equal(r[~np.isnan(r)], exp[~np.isnan(exp)])
    assert m.grid == g


def test_overview_chain_reads():
    """COG-style reduced-resolution IFD chain: list_overviews discovers the
    levels; read_geotiff(overview=k) returns the decimated band on the
    full-resolution extent at the coarser cell size."""
    import numpy as np
    import pytest

    from exactextractr_ray.grid import Grid
    from exactextractr_ray.sources.geotiff import (
        list_overviews, read_geotiff, write_geotiff,
    )

    g = Grid(0.0, 0.0, 64.0, 48.0, 1.0, 1.0)
    rng = np.random.default_rng(6)
    a = rng.integers(0, 1000, (48, 64)).astype(np.int32)
    p = "/tmp/test_ovr.tif"
    write_geotiff(a, g, p, compression=8, overviews=[2, 4])
    assert list_overviews(p) == [(32, 24), (16, 12)]

    r0, m0 = read_geotiff(p)
    np.testing.assert_array_equal(r0, a.astype(np.float64))
    assert m0.grid == g

    r1, m1 = read_geotiff(p, overview=0)
    np.testing.assert_array_equal(r1, a[::2, ::2].astype(np.float64))
    assert m1.grid == Grid(0.0, 0.0, 64.0, 48.0, 2.0, 2.0)

    r2, m2 = read_geotiff(p, overview=1)
    np.testing.assert_array_equal(r2, a[::4, ::4].astype(np.float64))
    assert (m2.grid.dx, m2.grid.dy) == (4.0, 4.0)

    with pytest.raises(ValueError, match="out of range"):
        read_geotiff(p, overview=2)


def test_multiband_chunky_and_planar():
    """Multi-band GeoTIFF band selection (GDAL band index contract,
    gdal_raster_wrapper.cpp:22-95): both PlanarConfiguration layouts, all
    writer compressions, with nodata masking per band."""
    import numpy as np
    import pytest

    from exactextractr_ray.grid import Grid
    from exactextractr_ray.sources.geotiff import read_geotiff, write_geotiff

    g = Grid(0.0, 0.0, 64.0, 48.0, 1.0, 1.0)
    rng = np.random.default_rng(9)
    mb = rng.normal(size=(48, 64, 3)).astype(np.float32)
    mb[2, 3, 0] = np.nan
    p = "/tmp/test_mb.tif"
    for planar, comp in [(1, 8), (2, 8), (1, 50000), (2, 1)]:
        write_geotiff(mb, g, p, nodata=-9999.0, compression=comp,
                      planar=planar)
        for b in range(1, 4):
            r, m = read_geotiff(p, band=b)
            exp = mb[:, :, b - 1].astype(np.float64)
            np.testing.assert_array_equal(np.isnan(r), np.isnan(exp))
            np.testing.assert_array_equal(
                r[~np.isnan(r)], exp[~np.isnan(exp)]
            )
            assert m.grid == g
    with pytest.raises(ValueError, match="band 4 out of range"):
        read_geotiff(p, band=4)


def test_multiband_overview_band_select():
    import numpy as np

    from exactextractr_ray.grid import Grid
    from exactextractr_ray.sources.geotiff import (
        list_overviews, read_geotiff, write_geotiff,
    )

    g = Grid(0.0, 0.0, 64.0, 48.0, 1.0, 1.0)
    rng = np.random.default_rng(10)
    mb = rng.integers(0, 10000, (48, 64, 2)).astype(np.int32)
    p = "/tmp/test_mbo.tif"
    write_geotiff(mb, g, p, overviews=[2])
    assert list_overviews(p) == [(32, 24)]
    r, m = read_geotiff(p, overview=0, band=2)
    np.testing.assert_array_equal(r, mb[::2, ::2, 1].astype(np.float64))
    assert (m.grid.dx, m.grid.dy) == (2.0, 2.0)


def test_predictor2_percomponent_unit():
    """TIFF 6.0 §14: horizontal differencing runs per COMPONENT — encode a
    3-band row by per-component diffs and check the decoder's 3-D cumsum
    reconstructs it (the multiband predictor-2 read path)."""
    import numpy as np

    from exactextractr_ray.sources.geotiff import _undo_predictor2

    rng = np.random.default_rng(11)
    orig = rng.integers(0, 65535, (4, 7, 3)).astype("<u2")
    enc = orig.copy()
    enc[:, 1:, :] = (orig[:, 1:, :].astype(np.int64)
                     - orig[:, :-1, :].astype(np.int64)) % 65536
    dec = _undo_predictor2(enc.astype("<u2"), np.dtype("<u2"), 16, "<")
    np.testing.assert_array_equal(dec.astype(np.uint16), orig)


def test_tiled_write_and_cog_layout():
    """Tile-organized writes (TileWidth/TileLength + edge padding) round-
    trip across compressions; tiled + overviews + ZSTD = the COG layout;
    tiled multiband in both planar configurations."""
    import numpy as np

    from exactextractr_ray.grid import Grid
    from exactextractr_ray.sources.geotiff import (
        list_overviews, read_geotiff, write_geotiff,
    )

    g = Grid(0.0, 0.0, 70.0, 50.0, 1.0, 1.0)  # non-multiples of tile
    rng = np.random.default_rng(2)
    a = rng.normal(size=(50, 70)).astype(np.float32)
    a[3, 4] = np.nan
    p = "/tmp/test_tiled.tif"
    for comp in (1, 8, 50000):
        write_geotiff(a, g, p, nodata=-9999.0, compression=comp, tile=16)
        r, m = read_geotiff(p)
        exp = a.astype(np.float64)
        np.testing.assert_array_equal(np.isnan(r), np.isnan(exp))
        np.testing.assert_array_equal(r[~np.isnan(r)], exp[~np.isnan(exp)])
        assert m.grid == g

    cog = "/tmp/test_cog.tif"
    write_geotiff(a, g, cog, nodata=-9999.0, compression=50000, tile=16,
                  overviews=[2, 4])
    assert list_overviews(cog) == [(35, 25), (18, 13)]
    r1, m1 = read_geotiff(cog, overview=0)
    e1 = a[::2, ::2].astype(np.float64)
    np.testing.assert_array_equal(r1[~np.isnan(r1)], e1[~np.isnan(e1)])

    mb = rng.normal(size=(50, 70, 3)).astype(np.float32)
    for planar in (1, 2):
        write_geotiff(mb, g, p, compression=8, tile=16, planar=planar)
        for b in (1, 2, 3):
            r, _ = read_geotiff(p, band=b)
            np.testing.assert_array_equal(r, mb[:, :, b - 1].astype(np.float64))


# ---------------- lazy range reads (GeoTiffFile / COG access pattern) ----


def _smooth_u16(h, w):
    x, y = np.meshgrid(np.arange(w), np.arange(h))
    return ((x * 7 + y * 13) % 60000).astype(np.uint16)


def test_window_read_matches_full(tmp_path):
    from exactextractr_ray.grid import Grid
    from exactextractr_ray.sources.geotiff import (
        GeoTiffFile,
        read_geotiff,
        write_geotiff,
    )

    img = _smooth_u16(130, 97).astype(np.float32)
    g = Grid(0, 0, 97, 130, 1.0, 1.0)
    p = str(tmp_path / "w.tif")
    write_geotiff(img, g, p, compression=8, tile=32)
    full, _ = read_geotiff(p)
    with GeoTiffFile(p) as gf:
        for (r0, c0, h, w) in [(0, 0, 130, 97), (10, 20, 50, 40),
                               (100, 60, 30, 37), (31, 31, 2, 2),
                               (129, 96, 1, 1)]:
            win = gf.read_window(r0, c0, h, w)
            assert np.array_equal(win, full[r0:r0 + h, c0:c0 + w])
        with pytest.raises(ValueError):
            gf.read_window(0, 0, 131, 97)


def test_window_read_fetches_only_needed_chunks(tmp_path):
    """The point of the lazy handle: a small window on a tiled file must
    touch only its intersecting tiles' byte ranges, never the whole file."""
    from exactextractr_ray.grid import Grid
    from exactextractr_ray.sources.geotiff import GeoTiffFile, write_geotiff

    img = _smooth_u16(256, 256).astype(np.float32)
    g = Grid(0, 0, 256, 256, 1.0, 1.0)
    p = str(tmp_path / "c.tif")
    write_geotiff(img, g, p, compression=8, tile=64)
    gf = GeoTiffFile(p)
    reads = []
    inner = gf._src

    class Spy:
        def get(self, off, size):
            reads.append((off, size))
            return inner.get(off, size)

    gf._src = Spy()
    gf.read_window(70, 70, 10, 10)  # strictly inside tile (1, 1)
    total_file = (tmp_path / "c.tif").stat().st_size
    fetched = sum(s for _, s in reads)
    assert len(reads) == 1  # exactly one chunk
    assert fetched < total_file / 4  # nowhere near a full-file read
    reads.clear()
    gf.read_window(60, 60, 10, 10)  # straddles 4 tiles
    assert len(reads) == 4
    gf.close()


def test_window_read_strips_and_nodata(tmp_path):
    from exactextractr_ray.grid import Grid
    from exactextractr_ray.sources.geotiff import GeoTiffFile, write_geotiff

    img = _smooth_u16(40, 50).astype(np.float64)
    img[5:9, 7:11] = np.nan
    g = Grid(0, 0, 50, 40, 1.0, 1.0)
    p = str(tmp_path / "s.tif")
    write_geotiff(img, g, p, nodata=-9999.0, compression=8)
    with GeoTiffFile(p) as gf:
        win = gf.read_window(4, 6, 8, 8)
        assert np.isnan(win[1:5, 1:5]).all()
        assert np.array_equal(win[0], img[4, 6:14])


def test_streaming_tile_dataset_no_driver_materialization(
    tmp_path, ray_session
):
    """geotiff_raster_dataset: tiles decoded in the actor pool match the
    driver-side full read exactly, including the ragged edge."""
    from exactextractr_ray.grid import Grid
    from exactextractr_ray.sources.geotiff import (
        geotiff_raster_dataset,
        read_geotiff,
        write_geotiff,
    )

    img = _smooth_u16(100, 90).astype(np.float32)
    g = Grid(0, 0, 90, 100, 1.0, 1.0)
    p = str(tmp_path / "d.tif")
    write_geotiff(img, g, p, compression=8, tile=32)
    full, _ = read_geotiff(p)
    rd = geotiff_raster_dataset(p, tile=48, concurrency=(1, 2))
    assert rd.grid.ncol == 90 and rd.tile_h == 48
    got = np.full((100, 90), np.nan)
    n_rows = 0
    for b in rd.ds.iter_batches(batch_size=None, batch_format="pyarrow"):
        for i in range(b.num_rows):
            r0 = b["row0"][i].as_py()
            c0 = b["col0"][i].as_py()
            th = b["th"][i].as_py()
            tw = b["tw"][i].as_py()
            vals = np.asarray(b["values"][i].as_py()).reshape(th, tw)
            got[r0:r0 + th, c0:c0 + tw] = vals
            n_rows += 1
    assert n_rows == 6  # ceil(100/48) * ceil(90/48) = 3 * 2
    assert np.array_equal(got, full)


def test_feature_seq_geotiff_matches_parquet_plan(tmp_path, ray_session):
    """GeoTIFF-backed feature-sequential plan (per-zone byte-range window
    reads) is bit-identical to the tile-parquet feature-sequential plan."""
    import numpy as np

    from exactextractr_ray import synth
    from exactextractr_ray.pipelines.zonal_feature_seq import (
        exact_extract_feature_seq,
        exact_extract_feature_seq_geotiff,
    )
    from exactextractr_ray.sources.geotiff import write_geotiff
    from exactextractr_ray.sources.raster import (
        synthetic_raster_dataset,
        write_raster_parquet,
    )
    from exactextractr_ray.sources.zones import synth_rect_zones

    N = 64
    rr = np.broadcast_to(np.arange(N)[:, None], (N, N))
    cc = np.broadcast_to(np.arange(N)[None, :], (N, N))
    arr = synth.synth_values(rr, cc)
    zones = synth_rect_zones(12, N)
    stats = ["count", "sum", "mean", "min", "max", "median", "mode"]
    tp = str(tmp_path / "r.tif")
    write_geotiff(arr, synth.synth_grid(N), tp, nodata=-9999.0,
                  compression=8, tile=16)
    pq = str(tmp_path / "pq")
    write_raster_parquet(synthetic_raster_dataset(n=N, tile=16), pq)
    a = exact_extract_feature_seq(pq, zones, stats).to_pandas()
    b = exact_extract_feature_seq_geotiff(tp, zones, stats, tile=16).to_pandas()
    assert a.equals(b)
    # a different virtual tiling must not change results either
    c = exact_extract_feature_seq_geotiff(tp, zones, stats, tile=25).to_pandas()
    import pandas.testing as pdt

    pdt.assert_frame_equal(b, c)


@pytest.mark.parametrize("tile", [None, 32])
def test_writer_predictors_roundtrip(tmp_path, tile):
    from exactextractr_ray.grid import Grid
    from exactextractr_ray.sources.geotiff import read_geotiff, write_geotiff

    g = Grid(0, 0, 97, 130, 1.0, 1.0)
    x, y = np.meshgrid(np.arange(97), np.arange(130))
    ints = (x * 3 + y * 5).astype(np.uint16)
    flts = (x * 0.5 + y * 0.25).astype(np.float32)
    pi = str(tmp_path / "i.tif")
    write_geotiff(ints, g, pi, compression=8, predictor=2, tile=tile)
    out, _ = read_geotiff(pi)
    assert np.array_equal(out, ints.astype(np.float64))
    # predictor 2 + deflate beats plain deflate on smooth integer data
    p0 = str(tmp_path / "i0.tif")
    write_geotiff(ints, g, p0, compression=8, tile=tile)
    import os

    assert os.path.getsize(pi) < os.path.getsize(p0)
    pf = str(tmp_path / "f.tif")
    write_geotiff(flts, g, pf, compression=8, predictor=3, tile=tile)
    outf, _ = read_geotiff(pf)
    assert np.array_equal(outf, flts.astype(np.float64))
    # multiband per-component differencing
    rgb = np.stack([ints, ints * 2, ints // 2], axis=-1).astype(np.uint16)
    pr = str(tmp_path / "rgb.tif")
    write_geotiff(rgb, g, pr, compression=8, predictor=2, tile=tile)
    for b in (1, 2, 3):
        outb, _ = read_geotiff(pr, band=b)
        assert np.array_equal(outb, rgb[:, :, b - 1].astype(np.float64))
    with pytest.raises(ValueError):
        write_geotiff(flts, g, str(tmp_path / "x.tif"), predictor=2)
    with pytest.raises(ValueError):
        write_geotiff(ints, g, str(tmp_path / "y.tif"), predictor=3)


@pytest.mark.parametrize("tile", [None, 16])
def test_jpeg_in_tiff_block_constant_exact(tmp_path, tile):
    """Compression 7 (Technote 2 abbreviated streams + JPEGTables tag):
    a raster constant on 8x8 blocks survives the lossy codec EXACTLY at
    quality 100 (DC-only blocks, unit quantizer), pinning the full
    Huffman/dequant/IDCT/TIFF-chunk path without a tolerance."""
    import numpy as np

    from exactextractr_ray.grid import Grid
    from exactextractr_ray.sources.geotiff import read_geotiff, write_geotiff

    rng = np.random.default_rng(12)
    blocks = rng.integers(0, 256, (6, 8)).astype(np.uint8)
    img = np.kron(blocks, np.ones((8, 8), np.uint8))
    g = Grid(0.0, 0.0, 64.0, 48.0, 1.0, 1.0)
    p = str(tmp_path / "jexact.tif")
    write_geotiff(img, g, p, compression=7, jpeg_quality=100, tile=tile)
    r, m = read_geotiff(p)
    assert np.array_equal(r, img.astype(np.float64))
    assert m.grid == g


@pytest.mark.parametrize("sub", ["4:4:4", "4:2:0"])
@pytest.mark.parametrize("tile", [None, 16])
def test_jpeg_in_tiff_ycbcr_rgb(tmp_path, sub, tile):
    """3-band YCbCr JPEG-in-TIFF (GDAL PHOTOMETRIC=YCBCR layout when
    subsampled): band reads return RGB within lossy tolerance; the
    YCbCrSubSampling tag matches the SOF sampling factors."""
    import numpy as np

    from exactextractr_ray.grid import Grid
    from exactextractr_ray.sources.geotiff import read_geotiff, write_geotiff

    yy, xx = np.mgrid[0:48, 0:64]
    rgb = np.dstack([
        (127 + 60 * np.sin(yy / 9.0)).astype(np.uint8),
        (127 + 60 * np.cos(xx / 11.0)).astype(np.uint8),
        (127 + 40 * np.sin((xx + yy) / 13.0)).astype(np.uint8),
    ])
    g = Grid(0.0, 0.0, 64.0, 48.0, 1.0, 1.0)
    p = str(tmp_path / "jycc.tif")
    write_geotiff(rgb, g, p, compression=7, jpeg_quality=95,
                  jpeg_subsampling=sub, tile=tile)
    tol = 4 if sub == "4:4:4" else 9
    for b in (1, 2, 3):
        r, _ = read_geotiff(p, band=b)
        assert np.abs(r - rgb[:, :, b - 1]).max() <= tol, (sub, tile, b)


def test_jpeg_subsampling_validation(tmp_path):
    import numpy as np

    from exactextractr_ray.grid import Grid
    from exactextractr_ray.sources.geotiff import write_geotiff

    g = Grid(0.0, 0.0, 8.0, 8.0, 1.0, 1.0)
    a = np.zeros((8, 8), np.uint8)
    with pytest.raises(ValueError, match="4:4:4 or 4:2:0"):
        write_geotiff(a, g, str(tmp_path / "z.tif"), compression=7,
                      jpeg_subsampling="4:2:2")
