"""Property-based kernel tests (hypothesis): the scanline coverage kernel vs
a brute-force per-cell Sutherland–Hodgman clipping oracle, plus invariants
(area conservation, translation equivariance, tile additivity)."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from exactextractr_ray import wkbio
from exactextractr_ray.coverage import coverage_matrix
from exactextractr_ray.grid import Grid


def clip_halfplane(pts: np.ndarray, axis: int, bound: float, keep_le: bool):
    """Sutherland–Hodgman clip of a ring against an axis-aligned halfplane."""
    out = []
    n = len(pts)
    for i in range(n):
        a, b = pts[i], pts[(i + 1) % n]
        ina = (a[axis] <= bound) if keep_le else (a[axis] >= bound)
        inb = (b[axis] <= bound) if keep_le else (b[axis] >= bound)
        if ina:
            out.append(a)
        if ina != inb:
            t = (bound - a[axis]) / (b[axis] - a[axis])
            out.append(a + t * (b - a))
    return np.asarray(out) if out else np.empty((0, 2))


def cell_clip_area(ring: np.ndarray, x0, y0, x1, y1) -> float:
    """Exact |ring ∩ cell| via successive halfplane clips + shoelace."""
    p = ring[:-1] if np.array_equal(ring[0], ring[-1]) else ring
    for axis, bound, keep_le in [(0, x0, False), (0, x1, True), (1, y0, False), (1, y1, True)]:
        if len(p) == 0:
            return 0.0
        p = clip_halfplane(p, axis, bound, keep_le)
    if len(p) < 3:
        return 0.0
    x, y = p[:, 0], p[:, 1]
    return 0.5 * abs(float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)))


def brute_force_coverage(grid: Grid, ring: np.ndarray) -> np.ndarray:
    out = np.zeros((grid.nrow, grid.ncol))
    cell_area = grid.dx * grid.dy
    for r in range(grid.nrow):
        for c in range(grid.ncol):
            x0 = grid.xmin + c * grid.dx
            y1 = grid.ymax - r * grid.dy
            out[r, c] = cell_clip_area(ring, x0, y1 - grid.dy, x0 + grid.dx, y1) / cell_area
    return out


def star_polygon(pts: np.ndarray) -> np.ndarray:
    """Simple (non-self-intersecting) polygon via angle sort around centroid."""
    ctr = pts.mean(axis=0)
    ang = np.arctan2(pts[:, 1] - ctr[1], pts[:, 0] - ctr[0])
    ring = pts[np.argsort(ang)]
    return np.vstack([ring, ring[:1]])


coords = st.floats(min_value=-2.0, max_value=8.0, allow_nan=False, width=64)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(coords, coords), min_size=3, max_size=10, unique=True))
def test_kernel_matches_bruteforce_clipping(points):
    pts = np.asarray(points)
    ring = star_polygon(pts)
    if abs(wkbio.ring_area_signed(ring)) < 1e-9:
        return
    g = Grid(0, 0, 6, 6, 1, 1)
    parts = wkbio.parse_wkb(wkbio.polygon_wkb(ring))
    fast = coverage_matrix(g, parts)
    slow = brute_force_coverage(g, parts[0]["rings"][0])
    np.testing.assert_allclose(fast, slow, atol=1e-9)


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.tuples(coords, coords), min_size=3, max_size=8, unique=True),
    st.floats(min_value=-3, max_value=3, allow_nan=False),
    st.floats(min_value=-3, max_value=3, allow_nan=False),
)
def test_translation_equivariance(points, dx_shift, dy_shift):
    pts = np.asarray(points)
    ring = star_polygon(pts)
    if abs(wkbio.ring_area_signed(ring)) < 1e-6:
        return
    g1 = Grid(0, 0, 8, 8, 1, 1)
    g2 = Grid(dx_shift, dy_shift, 8 + dx_shift, 8 + dy_shift, 1, 1)
    shifted = ring + np.array([dx_shift, dy_shift])
    c1 = coverage_matrix(g1, wkbio.parse_wkb(wkbio.polygon_wkb(ring)))
    c2 = coverage_matrix(g2, wkbio.parse_wkb(wkbio.polygon_wkb(shifted)))
    np.testing.assert_allclose(c1, c2, atol=1e-9)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.tuples(coords, coords), min_size=3, max_size=10, unique=True))
def test_tile_additivity(points):
    pts = np.asarray(points)
    ring = star_polygon(pts)
    if abs(wkbio.ring_area_signed(ring)) < 1e-9:
        return
    g = Grid(0, 0, 6, 6, 0.5, 0.5)  # 12x12
    parts = wkbio.parse_wkb(wkbio.polygon_wkb(ring))
    whole = coverage_matrix(g, parts)
    merged = np.zeros_like(whole)
    for r0 in (0, 6):
        for c0 in (0, 6):
            sub = g.subgrid(r0, c0, 6, 6)
            merged[r0 : r0 + 6, c0 : c0 + 6] = coverage_matrix(sub, parts)
    np.testing.assert_allclose(merged, whole, atol=1e-12)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.tuples(coords, coords), min_size=3, max_size=12, unique=True))
def test_area_conservation_on_containing_grid(points):
    pts = np.asarray(points)
    ring = star_polygon(pts)
    area = abs(wkbio.ring_area_signed(ring))
    if area < 1e-9:
        return
    g = Grid(-4, -4, 12, 12, 0.25, 0.25)  # contains the coordinate range
    cov = coverage_matrix(g, wkbio.parse_wkb(wkbio.polygon_wkb(ring)))
    assert cov.min() >= 0.0 and cov.max() <= 1.0
    assert cov.sum() * 0.0625 == pytest.approx(area, rel=1e-9, abs=1e-12)


lattice_coords = st.integers(min_value=-4, max_value=16).map(lambda i: i * 0.5)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(lattice_coords, lattice_coords), min_size=3, max_size=10, unique=True))
def test_kernel_matches_bruteforce_on_lattice(points):
    """Vertices exactly on cell boundaries/corners (half-integer lattice):
    the kernel's exact-crossing handling vs brute-force clipping."""
    pts = np.asarray(points)
    ring = star_polygon(pts)
    if abs(wkbio.ring_area_signed(ring)) < 1e-9:
        return
    g = Grid(0, 0, 6, 6, 1, 1)
    parts = wkbio.parse_wkb(wkbio.polygon_wkb(ring))
    fast = coverage_matrix(g, parts)
    slow = brute_force_coverage(g, parts[0]["rings"][0])
    np.testing.assert_allclose(fast, slow, atol=1e-9)


# ---- text-operator properties (hypothesis over the pure batch kernels) ----

@given(
    st.lists(
        st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126),
                max_size=2000),
        min_size=1, max_size=8,
    ),
    st.integers(min_value=2, max_value=64),
    st.integers(min_value=0, max_value=32),
)
@settings(max_examples=60, deadline=None)
def test_chunking_reassembles(texts, size, overlap):
    """For any texts and any (size, overlap<size): chunks reassemble the
    document exactly, every chunk except the last is full-size, and
    consecutive chunks share exactly `overlap` characters."""
    import pyarrow as pa

    from exactextractr_ray.stages.text import chunk_batch

    if overlap >= size:
        overlap = size - 1
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    out = chunk_batch(tbl, size=size, overlap=overlap).to_pandas()
    step = size - overlap
    for did, t in enumerate(texts):
        sub = out[out.doc_id == did].sort_values("chunk_idx")
        chunks = sub["chunk"].tolist()
        starts = sub["char_start"].tolist()
        if not t:
            assert chunks == []
            continue
        # the complete spec: chunk i is exactly t[i*step : i*step+size]
        assert starts == list(range(0, len(t), step))
        for s, c in zip(starts, chunks):
            assert c == t[s : s + size]
        rebuilt = "".join([chunks[0]] + [c[overlap:] for c in chunks[1:]])
        assert rebuilt == t


@given(
    st.lists(
        st.text(alphabet=st.sampled_from("ab "), max_size=60),
        min_size=1, max_size=6,
    ),
    st.integers(min_value=1, max_value=4),
)
@settings(max_examples=60, deadline=None)
def test_ngram_counts_match_bruteforce(texts, n):
    """Partial-count batches merged any way equal the naive corpus count."""
    from collections import Counter

    import pyarrow as pa

    from exactextractr_ray.stages.text import ngram_count_batch

    truth: Counter = Counter()
    for t in texts:
        toks = t.split()
        for i in range(len(toks) - n + 1):
            truth[" ".join(toks[i : i + n])] += 1

    # split the corpus into two arbitrary batches; sums must agree
    mid = len(texts) // 2
    got: Counter = Counter()
    for part in (texts[:mid], texts[mid:]):
        tbl = pa.table({"text": pa.array(part, pa.string())})
        b = ngram_count_batch(tbl, n=n)
        got.update(dict(zip(b.column("ngram").to_pylist(),
                            b.column("cnt").to_pylist())))
    assert got == truth


# ---- CRS projection properties (hypothesis over random parameters) ----


@settings(max_examples=40, deadline=None)
@given(
    lat1=st.floats(20.0, 44.0),
    dlat=st.floats(2.0, 20.0),
    lat0=st.floats(10.0, 60.0),
    lon0=st.floats(-170.0, 170.0),
    lon_off=st.floats(-15.0, 15.0),
    lat_p=st.floats(15.0, 64.0),
)
def test_albers_roundtrip_random_params(lat1, dlat, lat0, lon0, lon_off, lat_p):
    """AEA forward∘inverse closes below 1e-6 m for arbitrary legal 2SP
    parameter sets and in-cone points."""
    from exactextractr_ray.functions.crs import AlbersEqualArea

    p = AlbersEqualArea(lat1, lat1 + dlat, lat0, lon0)
    lon = np.array([lon0 + lon_off])
    lat = np.array([lat_p])
    x, y = p.forward(lon, lat)
    lon2, lat2 = p.inverse(x, y)
    err_m = float(
        np.hypot((lon2 - lon) * np.cos(np.radians(lat)), lat2 - lat) * 111320.0
    )
    assert err_m < 1e-6


@settings(max_examples=40, deadline=None)
@given(
    lat1=st.floats(25.0, 48.0),
    dlat=st.floats(2.0, 15.0),
    lon0=st.floats(-170.0, 170.0),
    lon_off=st.floats(-12.0, 12.0),
    lat_p=st.floats(20.0, 60.0),
)
def test_lcc_roundtrip_random_params(lat1, dlat, lon0, lon_off, lat_p):
    from exactextractr_ray.functions.crs import LambertConformalConic

    p = LambertConformalConic(lat1, lat1 + dlat, lat1, lon0, 0.0, 0.0)
    lon = np.array([lon0 + lon_off])
    lat = np.array([lat_p])
    x, y = p.forward(lon, lat)
    lon2, lat2 = p.inverse(x, y)
    err_m = float(
        np.hypot((lon2 - lon) * np.cos(np.radians(lat)), lat2 - lat) * 111320.0
    )
    assert err_m < 1e-6


# ---- raster file-format round-trip properties ----


@settings(max_examples=15, deadline=None)
@given(
    h=st.integers(2, 40),
    w=st.integers(2, 40),
    seed=st.integers(0, 2**31 - 1),
    fmt=st.sampled_from(["tif", "tif_zstd", "nc", "asc"]),
)
def test_raster_format_roundtrip_random(h, w, seed, fmt, tmp_path_factory):
    """Random-shaped float rasters with NaN holes round-trip bit-exactly
    through every file-format source (GeoTIFF deflate/zstd, NetCDF
    classic, ASCII grid keeps %.17g which is float64-exact)."""
    from exactextractr_ray.grid import Grid as _G
    from exactextractr_ray.sources.ascii_grid import (
        read_ascii_grid, write_ascii_grid,
    )
    from exactextractr_ray.sources.geotiff import read_geotiff, write_geotiff
    from exactextractr_ray.sources.netcdf_raster import (
        read_netcdf_raster, write_netcdf_raster,
    )

    rng = np.random.default_rng(seed)
    a = rng.normal(size=(h, w)) * 100
    a[rng.random((h, w)) < 0.1] = np.nan
    g = _G(0.0, 0.0, float(w), float(h), 1.0, 1.0)
    d = tmp_path_factory.mktemp("fmt")
    if fmt == "asc":
        p = str(d / "r.asc")
        write_ascii_grid(a, g, p)
        r, gr = read_ascii_grid(p)
    elif fmt == "nc":
        p = str(d / "r.nc")
        write_netcdf_raster(a, g, p, nodata=-1e30)
        r, gr = read_netcdf_raster(p)
    else:
        p = str(d / "r.tif")
        comp = 50000 if fmt == "tif_zstd" else 8
        write_geotiff(a, g, p, nodata=-1e30, compression=comp)
        r, m = read_geotiff(p)
        gr = m.grid
    assert gr == g
    np.testing.assert_array_equal(np.isnan(r), np.isnan(a))
    np.testing.assert_array_equal(r[~np.isnan(r)], a[~np.isnan(a)])
