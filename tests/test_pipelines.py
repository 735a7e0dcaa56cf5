"""Ray Data pipeline tests: end-to-end operator correctness against
kernel-computed truth, parallelism/tiling invariance, reference semantics
(NaN rows, ordering, tie-breaks, mass conservation)."""

import numpy as np
import pandas as pd
import pytest

from exactextractr_ray import synth, wkbio
from exactextractr_ray.coverage import coverage_fraction_wkb
from exactextractr_ray.grid import Grid
from exactextractr_ray.stats import RasterStats


@pytest.fixture(scope="module")
def _ray(ray_session):
    return None


def _truth_stats(n, bounds, weights=False):
    g = synth.synth_grid(n)
    rr, cc = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    vals = synth.synth_values(rr, cc)
    wts = synth.synth_weights(rr, cc) if weights else None
    cov = coverage_fraction_wkb(g, wkbio.rect_wkb(*bounds))
    st = RasterStats(store_values=True)
    st.process(vals, cov, wts)
    return st


def test_exact_extract_matches_kernel(_ray):
    from exactextractr_ray.pipelines.zonal import exact_extract
    from exactextractr_ray.sources.raster import synthetic_raster_dataset
    from exactextractr_ray.sources.zones import synth_rect_zones

    rd = synthetic_raster_dataset(n=64, tile=16, layers=("value", "weight"))
    res = exact_extract(
        rd,
        synth_rect_zones(4, 64),
        ["count", "sum", "mean", "median", "variety", "variance", "weighted_mean"],
        weight_layer="weight",
    ).to_pandas()
    for k in range(4):
        st = _truth_stats(64, synth.synth_rect_zone_bounds(k, 64), weights=True)
        row = res[res.zone_id == k].iloc[0]
        assert row["count"] == st.count()
        assert row["sum"] == st.sum()
        assert row["mean"] == st.mean()
        assert row["median"] == pytest.approx(st.median(), rel=1e-12)
        assert row["variety"] == st.variety()
        assert row["variance"] == pytest.approx(st.variance(), rel=1e-9)
        assert row["weighted_mean"] == pytest.approx(st.weighted_mean(), rel=1e-12)


def test_tile_size_invariance(_ray):
    """max_cells_in_memory=1 analog: results identical across tilings
    (test_exact_extract.R:598-604)."""
    from exactextractr_ray.pipelines.zonal import exact_extract
    from exactextractr_ray.sources.raster import synthetic_raster_dataset
    from exactextractr_ray.sources.zones import synth_rect_zones

    zones = synth_rect_zones(3, 64)
    results = []
    for tile in (8, 16, 64):
        rd = synthetic_raster_dataset(n=64, tile=tile)
        df = exact_extract(rd, zones, ["count", "sum", "mean", "median"]).to_pandas()
        results.append(df.sort_values("zone_id").reset_index(drop=True))
    for other in results[1:]:
        pd.testing.assert_frame_equal(results[0], other)


def test_zone_outside_grid_nan_row(_ray):
    from exactextractr_ray.pipelines.zonal import exact_extract
    from exactextractr_ray.sources.raster import synthetic_raster_dataset
    from exactextractr_ray.sources.zones import fixture_zones

    rd = synthetic_raster_dataset(n=16, tile=8)
    res = exact_extract(rd, fixture_zones(16), ["count", "mean"]).to_pandas()
    out_row = res[res.zone_id == 6].iloc[0]  # "outside" zone
    assert out_row["count"] == 0.0
    assert np.isnan(out_row["mean"])
    # ordering contract: input order preserved
    assert list(res["zone_id"]) == list(range(7))


def test_all_zones_disjoint_nan_rows(_ray):
    """NO zone intersects the raster at all: one NA row per zone, same column
    set as the covered case (ref returns NA rows for disjoint polygons;
    regression for the empty-aggregation KeyError)."""
    from exactextractr_ray import wkbio
    from exactextractr_ray.pipelines.zonal import exact_extract
    from exactextractr_ray.sources.raster import synthetic_raster_dataset
    from exactextractr_ray.sources.zones import zone_table

    rd = synthetic_raster_dataset(n=16, tile=8)
    zones = zone_table(
        [
            (0, "far0", wkbio.rect_wkb(100.0, 100.0, 110.0, 110.0)),
            (1, "far1", wkbio.rect_wkb(-50.0, -50.0, -40.0, -40.0)),
        ]
    )
    res = exact_extract(
        rd, zones, ["count", "sum", "mean", "median", "variety"]
    ).to_pandas()
    assert list(res["zone_id"]) == [0, 1]
    assert (res["count"] == 0.0).all()
    assert (res["sum"] == 0.0).all()
    assert (res["variety"] == 0.0).all()
    assert res["mean"].isna().all()
    assert res["median"].isna().all()

    # quantile + frac columns survive the empty path too
    res2 = exact_extract(
        rd, zones, ["quantile", "frac"], quantiles=[0.25, 0.75]
    ).to_pandas()
    assert len(res2) == 2


def test_fixture_zone_shapes(_ray):
    """multipolygon / hole / circle zones run through the full pipeline."""
    from exactextractr_ray.pipelines.zonal import exact_extract
    from exactextractr_ray.sources.raster import synthetic_raster_dataset
    from exactextractr_ray.sources.zones import fixture_zones

    n = 32
    rd = synthetic_raster_dataset(n=n, tile=8)
    res = exact_extract(rd, fixture_zones(n), ["count"]).to_pandas()
    g = synth.synth_grid(n)
    rr, cc = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    vals = synth.synth_values(rr, cc)
    from exactextractr_ray.sources.zones import parse_zone_table
    from exactextractr_ray.coverage import coverage_matrix

    zset = parse_zone_table(fixture_zones(n))
    for i in range(len(zset)):
        cov = coverage_matrix(g, zset.parts[i])
        expected = float(np.sum(cov[~np.isnan(vals)]))
        got = res[res.zone_id == zset.zone_ids[i]]["count"].iloc[0]
        assert got == pytest.approx(expected, abs=1e-9), f"zone {i}"


def test_extract_cells_totals(_ray):
    from exactextractr_ray.pipelines.zonal import extract_cells
    from exactextractr_ray.sources.raster import synthetic_raster_dataset
    from exactextractr_ray.sources.zones import synth_rect_zones

    rd = synthetic_raster_dataset(n=32, tile=8)
    df = extract_cells(rd, synth_rect_zones(2, 32), include_cell=True).to_pandas()
    for k in range(2):
        st = _truth_stats(32, synth.synth_rect_zone_bounds(k, 32))
        sub = df[(df.zone_id == k) & df.value.notna()]
        assert sub["cov"].sum() == pytest.approx(st.count(), rel=1e-12)
        assert (sub["value"] * sub["cov"]).sum() == pytest.approx(st.sum(), rel=1e-12)
    # cell ids unique per zone
    assert not df.duplicated(subset=["zone_id", "cell"]).any()


def test_pip_join_vs_bruteforce(_ray):
    import ray.data
    from exactextractr_ray.stages.pip_join import pip_join, point_in_parts
    from exactextractr_ray.sources.zones import synth_geo_zones, parse_zone_table

    rng = np.random.default_rng(42)
    n = 2000
    pts = pd.DataFrame(
        {
            "pid": np.arange(n),
            "lon": rng.uniform(-180, 180, n),
            "lat": rng.uniform(-60, 60, n),
        }
    )
    zones = synth_geo_zones(16)
    joined = pip_join(ray.data.from_pandas(pts), zones).to_pandas()
    zset = parse_zone_table(zones)
    expected = 0
    for zi in range(len(zset)):
        hit = point_in_parts(
            pts["lon"].to_numpy(), pts["lat"].to_numpy(), zset.parts[zi]
        )
        expected += int(hit.sum())
        got = set(joined[joined.zone_id == zset.zone_ids[zi]]["pid"])
        assert got == set(pts["pid"][hit]), f"zone {zi}"
    assert len(joined) == expected


def test_pip_polygon_nonrect(_ray):
    """PIP against a circle: matches the analytic disk test for interior
    points away from the 30-gon boundary."""
    from exactextractr_ray.stages.pip_join import point_in_parts

    wkb = wkbio.circle_wkb(0, 0, 10, segments=64)
    parts = wkbio.parse_wkb(wkb)
    rng = np.random.default_rng(1)
    px = rng.uniform(-12, 12, 5000)
    py = rng.uniform(-12, 12, 5000)
    r = np.hypot(px, py)
    clear = np.abs(r - 10) > 0.2  # keep away from polygon-vs-circle edge band
    got = point_in_parts(px, py, parts)
    np.testing.assert_array_equal(got[clear], (r < 10)[clear])


def test_rasterize_tiebreak_and_min_coverage(_ray):
    from exactextractr_ray.pipelines.rasterize import rasterize_polygons
    from exactextractr_ray.sources.zones import zone_table

    g = Grid(0, 0, 4, 4, 1, 1)
    # two rects meeting at x=2.5: col 2 gets 0.5 coverage from each -> tie;
    # zone 1 listed second -> loses the tie
    zones = zone_table(
        [
            (0, "a", wkbio.rect_wkb(0, 0, 2.5, 4)),
            (1, "b", wkbio.rect_wkb(2.5, 0, 4, 4)),
        ]
    )
    tiles = rasterize_polygons(zones, g, tile=4).to_pandas()
    zi = np.asarray(tiles.iloc[0]["zone_index"], dtype=np.int32).reshape(4, 4)
    # col 0,1: zone 0 full; col 2: 0.5 vs 0.5 tie -> zone 0; col 3: zone 1
    assert (zi[:, 0] == 0).all() and (zi[:, 1] == 0).all()
    assert (zi[:, 2] == 0).all()
    assert (zi[:, 3] == 1).all()

    tiles2 = rasterize_polygons(zones, g, tile=4, min_coverage=0.6).to_pandas()
    zi2 = np.asarray(tiles2.iloc[0]["zone_index"], dtype=np.int32).reshape(4, 4)
    # col 2 total coverage = 1.0 >= 0.6 -> still assigned
    assert (zi2[:, 2] == 0).all()


def test_resample_mass_conservation(_ray):
    """sum is preserved under regridding (test_exact_resample.R:16-43)."""
    from exactextractr_ray.pipelines.resample import exact_resample
    from exactextractr_ray.sources.raster import synthetic_raster_dataset

    rd = synthetic_raster_dataset(n=32, tile=8)
    dst = Grid(0.0, 0.0, 32.0, 32.0, 32.0 / 12, 32.0 / 12)  # non-aligned 12x12
    out = exact_resample(rd, dst, stat="sum").to_pandas()
    rr, cc = np.meshgrid(np.arange(32), np.arange(32), indexing="ij")
    vals = synth.synth_values(rr, cc)
    assert out["value"].sum() == pytest.approx(np.nansum(vals), rel=1e-10)


def test_dedup_exact_keeper(_ray):
    import ray.data
    from exactextractr_ray.stages.dedup import exact_dedup

    df = pd.DataFrame(
        {
            "doc_id": np.arange(6, dtype=np.int64),
            "text": ["aa", "bb", "aa", "cc", "bb", "aa"],
        }
    )
    out = exact_dedup(ray.data.from_pandas(df)).to_pandas()
    m = {r.keeper_id: r.n_dups for r in out.itertuples()}
    assert m == {0: 3, 1: 2, 3: 1}


def test_minhash_finds_near_dups(_ray):
    import ray.data
    from exactextractr_ray.stages.dedup import minhash_lsh_pairs

    base = "the quick brown fox jumps over the lazy dog again and again " * 5
    near = base.replace("lazy", "sleepy")
    far = "completely different words nothing shared here at all " * 6
    df = pd.DataFrame(
        {"doc_id": [1, 2, 3], "text": [base.strip(), near.strip(), far.strip()]}
    )
    out = minhash_lsh_pairs(
        ray.data.from_pandas(df), threshold=0.5, num_hashes=64, bands=16
    ).to_pandas()
    pairs = set(zip(out.doc_a, out.doc_b))
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_minhash_paths_identical(_ray, monkeypatch):
    """The broadcast-routing fast path and the distributed routing join
    must emit byte-identical pair sets."""
    import ray.data

    import exactextractr_ray.stages.dedup as dd

    rng = np.random.default_rng(8)
    words = [f"w{i}" for i in range(80)]
    texts = []
    for i in range(40):
        toks = list(rng.choice(words, size=30))
        texts.append(" ".join(toks))
        if i % 4 == 0:  # near-dup: mutate two tokens
            mut = toks.copy()
            mut[3], mut[7] = "zz", "yy"
            texts.append(" ".join(mut))
    df = pd.DataFrame(
        {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
    )
    ds = ray.data.from_pandas(df).repartition(5)

    def run():
        return (
            dd.minhash_lsh_pairs(ds, threshold=0.5)
            .to_pandas()
            .sort_values(["doc_a", "doc_b"])
            .reset_index(drop=True)
        )

    fast = run()
    monkeypatch.setattr(dd, "_ROUTING_COLLECT_CAP", 0)  # force distributed
    dist = run()
    assert len(fast) > 0
    pd.testing.assert_frame_equal(fast, dist)


def test_knn_matches_numpy(_ray):
    import ray.data
    from exactextractr_ray.stages.knn import knn_cosine

    rng = np.random.default_rng(5)
    n, d = 300, 16
    mat = rng.standard_normal((n, d))
    df = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64)})
    df["embedding"] = [row.tolist() for row in mat]
    ds = ray.data.from_pandas(df)
    out = knn_cosine(ds, np.arange(3), mat[:3], k=5).to_pandas()
    nm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = nm @ nm[:3].T
    for q in range(3):
        s = sims[:, q].copy()
        s[q] = -np.inf
        expect = list(np.argsort(-s, kind="stable")[:5])
        got = list(
            out[out.query_id == q].sort_values("rank")["neighbor_id"].astype(int)
        )
        assert got == expect


def test_extract_text_byte_identity(_ray):
    from exactextractr_ray.sources.pages import read_pages
    from exactextractr_ray.stages.text import extract_text_batch

    pages = read_pages("/root/testdata/sf0.001").map_batches(
        extract_text_batch, batch_format="pyarrow"
    )
    df = pages.select_columns(["text", "extracted_text"]).to_pandas()
    assert (df["text"] == df["extracted_text"]).all()


def test_coverage_fraction_tiles_reassemble(_ray):
    from exactextractr_ray.pipelines.coverage_tiles import coverage_fraction
    from exactextractr_ray.sources.zones import zone_table

    n = 32
    g = synth.synth_grid(n)
    wkb = wkbio.circle_wkb(12, 14, 9, segments=24)
    zones = zone_table([(0, "c", wkb)])
    tiles = coverage_fraction(zones, g, tile=8).to_pandas()
    full = np.zeros((n, n))
    for _, r in tiles.iterrows():
        cov = np.asarray(r["coverage"]).reshape(r["th"], r["tw"])
        full[r["row0"] : r["row0"] + r["th"], r["col0"] : r["col0"] + r["tw"]] = cov
    np.testing.assert_allclose(
        full, coverage_fraction_wkb(g, wkb), atol=1e-12
    )


def test_partitioned_zones_matches_broadcast(_ray):
    """Range-partitioned zone join (no broadcast) produces bit-identical
    stats to the broadcast plan."""
    import ray.data
    from exactextractr_ray.pipelines.zonal import exact_extract
    from exactextractr_ray.pipelines.zonal_partitioned import (
        exact_extract_partitioned,
    )
    from exactextractr_ray.sources.raster import synthetic_raster_dataset
    from exactextractr_ray.sources.zones import synth_rect_zones

    zones_tbl = synth_rect_zones(6, 64)
    broadcast = (
        exact_extract(
            synthetic_raster_dataset(n=64, tile=16), zones_tbl,
            ["count", "sum", "mean", "median"],
        )
        .to_pandas()
        .sort_values("zone_id")
        .reset_index(drop=True)
    )
    part = exact_extract_partitioned(
        synthetic_raster_dataset(n=64, tile=16),
        ray.data.from_arrow(zones_tbl),
        ["count", "sum", "mean", "median"],
    ).to_pandas()
    for c in ["count", "sum", "mean", "median"]:
        assert np.array_equal(broadcast[c].to_numpy(), part[c].to_numpy())


def test_resample_apply_udf(_ray):
    """User-function resample (reference fun= path) matches the named-stat
    path for an equivalent function."""
    from exactextractr_ray.pipelines.resample import (
        exact_resample,
        exact_resample_apply,
    )
    from exactextractr_ray.sources.raster import synthetic_raster_dataset

    dst = Grid(0.0, 0.0, 32.0, 32.0, 32.0 / 12, 32.0 / 12)

    def cov_weighted_mean(values, cov):
        m = ~np.isnan(values)
        return np.sum(values[m] * cov[m]) / np.sum(cov[m])

    named = (
        exact_resample(synthetic_raster_dataset(n=32, tile=8), dst, stat="mean")
        .to_pandas()
        .sort_values("cell")
        .reset_index(drop=True)
    )
    udf = (
        exact_resample_apply(
            synthetic_raster_dataset(n=32, tile=8), dst, cov_weighted_mean
        )
        .to_pandas()
        .sort_values("cell")
        .reset_index(drop=True)
    )
    assert len(named) == len(udf)
    assert np.allclose(named["value"].to_numpy(), udf["value"].to_numpy(), rtol=1e-12)


def test_feature_sequential_matches_raster_sequential(_ray, tmp_path):
    """The reference's second processing strategy
    (feature_sequential_processor.cpp): zones are the parallel unit, raster
    windows read on demand with predicate pushdown. Results must be
    bit-identical to the raster-sequential plan."""
    from exactextractr_ray.pipelines.zonal import exact_extract
    from exactextractr_ray.pipelines.zonal_feature_seq import (
        exact_extract_feature_seq,
    )
    from exactextractr_ray.sources.raster import (
        synthetic_raster_dataset,
        write_raster_parquet,
    )
    from exactextractr_ray.sources.zones import synth_rect_zones

    rd = synthetic_raster_dataset(n=128, tile=32, layers=("value", "weight"))
    pq_dir = str(tmp_path / "tiles")
    write_raster_parquet(rd, pq_dir)
    zones = synth_rect_zones(10, 128)
    stats = ["count", "sum", "mean", "min", "max", "median", "weighted_mean"]

    rd2 = synthetic_raster_dataset(n=128, tile=32, layers=("value", "weight"))
    base = exact_extract(
        rd2, zones, stats, weight_layer="weight"
    ).to_pandas()
    got = exact_extract_feature_seq(
        pq_dir, zones, stats, weight_layer="weight"
    ).to_pandas()
    base = base.sort_values("zone_id").reset_index(drop=True)
    got = got.sort_values("zone_id").reset_index(drop=True)
    for c in stats:
        np.testing.assert_array_equal(
            got[c].to_numpy(), base[c].to_numpy(), err_msg=c
        )


def test_resample_apply_arity_error(_ray):
    """Transcribed: test_exact_resample_terra.R:132-144 — wrong-signature fn
    raises the reference's error."""
    from exactextractr_ray.pipelines.resample import exact_resample_apply
    from exactextractr_ray.sources.raster import synthetic_raster_dataset

    rd = synthetic_raster_dataset(n=16, tile=8)
    g = synth.synth_grid(4)
    with pytest.raises(ValueError, match="does not appear to be of the form"):
        exact_resample_apply(rd, g, lambda v: v.sum())


def test_edge_index_high_vertex_polygon(_ray):
    """Coastline-scale polygons: the y-banded EdgeIndex must agree with the
    flat even-odd / winding tests bit-for-bit, and the PIP join must use it
    transparently for >=256-edge zones."""
    import ray.data
    from exactextractr_ray.stages.pip_join import (
        EdgeIndex,
        PIPJoinZones,
        pip_join,
        point_in_parts,
        winding_number,
    )
    from exactextractr_ray.sources.zones import parse_zone_table, zone_table

    # a 5000-vertex wiggly "coastline" ring around (0, 0)
    rng = np.random.default_rng(17)
    th = np.linspace(0, 2 * np.pi, 5001)[:-1]
    r = 10.0 + np.cumsum(rng.normal(0, 0.05, len(th)))
    r -= np.linspace(0, r[-1] - r[0], len(r))  # close smoothly
    r = np.clip(r, 5.0, 15.0)
    ring = np.column_stack([r * np.cos(th), r * np.sin(th)])
    ring = np.vstack([ring, ring[:1]])
    wkb = wkbio.polygon_wkb(ring, [])
    parts = wkbio.parse_wkb(wkb)

    pts_x = rng.uniform(-16, 16, 4000)
    pts_y = rng.uniform(-16, 16, 4000)
    idx = EdgeIndex(parts)
    np.testing.assert_array_equal(
        idx.point_in(pts_x, pts_y), point_in_parts(pts_x, pts_y, parts)
    )
    np.testing.assert_array_equal(
        idx.winding(pts_x, pts_y), winding_number(pts_x, pts_y, parts)
    )

    # end-to-end: join rows identical whether or not the index kicks in
    zones = zone_table([(0, "coast", wkb)])
    pdf = pd.DataFrame({"pid": np.arange(4000), "lon": pts_x, "lat": pts_y})
    joined = pip_join(ray.data.from_pandas(pdf), zones).to_pandas()
    inside = point_in_parts(pts_x, pts_y, parts)
    assert set(joined["pid"]) == set(pdf["pid"][inside])
    # the stage actually built an index for this zone
    from exactextractr_ray.sources.zones import parse_zone_table as _p
    stage = PIPJoinZones(_p(zones))
    assert 0 in stage.edge_index


def test_random_polygons_pipeline_vs_kernel(_ray):
    """End-to-end fuzz: 40 random simple (convex-ish star) polygons through
    the FULL distributed pipeline must match per-zone kernel truth exactly —
    covers the tile decomposition, interior fast path, partial merge, and
    zone bookkeeping on arbitrary geometry."""
    from exactextractr_ray.pipelines.zonal import exact_extract
    from exactextractr_ray.sources.raster import synthetic_raster_dataset
    from exactextractr_ray.sources.zones import zone_table

    n = 48
    rng = np.random.default_rng(23)
    rows = []
    for k in range(40):
        cx, cy = rng.uniform(4, n - 4, 2)
        nv = int(rng.integers(3, 12))
        th = np.sort(rng.uniform(0, 2 * np.pi, nv))
        r = rng.uniform(1.0, min(cx, cy, n - cx, n - cy))
        ring = np.column_stack([cx + r * np.cos(th), cy + r * np.sin(th)])
        ring = np.vstack([ring, ring[:1]])
        rows.append((k, f"p{k}", wkbio.polygon_wkb(ring, [])))
    zones = zone_table(rows)
    rd = synthetic_raster_dataset(n=n, tile=16)
    res = exact_extract(rd, zones, ["count", "sum", "min", "max"]).to_pandas()

    g = synth.synth_grid(n)
    rr, cc = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    vals = synth.synth_values(rr, cc)
    for k in range(40):
        cov = coverage_fraction_wkb(g, rows[k][2])
        st = RasterStats()
        st.process(vals, cov)
        got = res[res.zone_id == k].iloc[0]
        assert got["count"] == pytest.approx(st.count(), rel=1e-12), k
        assert got["sum"] == pytest.approx(st.sum(), rel=1e-12), k
        if st.count() > 0:
            assert got["min"] == st.min and got["max"] == st.max, k
        else:
            assert np.isnan(got["min"]), k


def test_tile_pruning_to_zone_envelope(_ray):
    """Tiles outside the zones' union envelope never stream: a corner zone
    on a 64x64 raster (16 tiles) keeps only its 2x2 tile neighborhood, and
    the stats are unchanged."""
    from exactextractr_ray.pipelines.zonal import (
        _prune_tiles_to_zones,
        exact_extract,
    )
    from exactextractr_ray.sources.raster import synthetic_raster_dataset
    from exactextractr_ray.sources.zones import parse_zone_table, zone_table

    rd = synthetic_raster_dataset(n=64, tile=16)
    zones = zone_table([(0, "corner", wkbio.rect_wkb(1.0, 1.0, 20.0, 20.0))])
    zset = parse_zone_table(zones)
    pruned = _prune_tiles_to_zones(rd, zset)
    # zone spans x,y in [1,20] -> columns 0..19, rows 44..62 -> tiles with
    # col0 in {0,16} and row0 in {32,48}: 4 of 16 tiles survive
    assert pruned.count() == 4
    res = exact_extract(rd, zones, ["count", "sum"]).to_pandas()
    st = _truth_stats(64, (1.0, 1.0, 20.0, 20.0))
    assert res["count"].iloc[0] == pytest.approx(st.count(), rel=1e-12)
    assert res["sum"].iloc[0] == pytest.approx(st.sum(), rel=1e-12)


def test_partitioned_disjoint_zones_na_rows(_ray):
    """Partitioned plan with zones disjoint from the raster: NA rows, not a
    hash-join schema crash (parity with the broadcast plan and the
    reference's NA-for-disjoint-polygons contract)."""
    import math

    import ray.data
    from exactextractr_ray import wkbio
    from exactextractr_ray.pipelines.zonal_partitioned import (
        exact_extract_partitioned,
    )
    from exactextractr_ray.sources.raster import raster_from_array
    from exactextractr_ray.sources.zones import zone_table

    rd = raster_from_array(np.ones((8, 8)), Grid(0, 0, 8, 8, 1, 1), tile=4)
    # every zone disjoint
    t = exact_extract_partitioned(
        rd,
        ray.data.from_arrow(
            zone_table([(1, "far", wkbio.rect_wkb(100, 100, 110, 110))])
        ),
        ["mean", "sum"],
    ).to_pandas()
    assert list(t["zone_id"]) == [1]
    # reference defaults for a disjoint polygon: sum 0, mean NA
    # (test_exact_extract.R:433-485)
    assert math.isnan(t["mean"].iloc[0]) and t["sum"].iloc[0] == 0.0

    # mixed: one covered, one disjoint
    t2 = exact_extract_partitioned(
        rd,
        ray.data.from_arrow(
            zone_table(
                [
                    (1, "in", wkbio.rect_wkb(0.2, 0.2, 1.8, 1.8)),
                    (2, "out", wkbio.rect_wkb(100, 100, 110, 110)),
                ]
            )
        ),
        ["mean", "sum"],
    ).to_pandas()
    assert list(t2["zone_id"]) == [1, 2]
    assert t2["mean"].iloc[0] == 1.0 and math.isnan(t2["mean"].iloc[1])


def test_resample_stat_validation(_ray):
    """Transcribed test_exact_resample.R:45-66 — single-stat contract and
    the weighted-stat rejection."""
    from exactextractr_ray.pipelines.resample import exact_resample
    from exactextractr_ray.sources.raster import synthetic_raster_dataset

    rd = synthetic_raster_dataset(n=16, tile=8)
    dst = Grid(0.0, 0.0, 16.0, 16.0, 8.0, 8.0)
    with pytest.raises(ValueError, match="single"):
        exact_resample(rd, dst, stat=["sum", "mean"])
    with pytest.raises(ValueError, match="single"):
        exact_resample(rd, dst, stat="")
    with pytest.raises(ValueError, match="cannot be used for resampling"):
        exact_resample(rd, dst, stat="weighted_mean")


def test_resample_shifted_grid_mode(_ray):
    """Transcribed test_exact_resample.R:92-113 (issue #47): stored-value
    stats work on a target grid shifted off the source lattice; every mode
    is one of the source's values."""
    from exactextractr_ray.pipelines.resample import exact_resample
    from exactextractr_ray.sources.raster import raster_from_array

    rng = np.random.RandomState(1111)
    vals = np.round(rng.normal(0, 1, (16, 16)))
    rd = raster_from_array(vals, Grid(0, 0, 32, 32, 2, 2), tile=8)
    # target: same resolution, shifted by (2.5, 1) like raster::shift
    dst = Grid(2.5, 1.0, 34.5, 33.0, 2.0, 2.0)
    out = exact_resample(rd, dst, stat="mode").to_pandas()
    assert len(out) > 1
    got = set(out["value"].unique())
    assert got <= set(np.unique(vals))
    assert len(got) > 1


def test_zonal_variety_kmv(_ray):
    """KMV approximate variety: exact below k, ~1/sqrt(k) relative error
    above k, merge-order invariant across tilings."""
    from exactextractr_ray.pipelines.sketch import zonal_variety_approx
    from exactextractr_ray.pipelines.zonal import exact_extract
    from exactextractr_ray.sources.raster import raster_from_array
    from exactextractr_ray.sources.zones import zone_table

    n = 128
    rng = np.random.RandomState(9)
    # continuous values: ~16k distinct in the zone, far above k
    vals = rng.rand(n, n)
    g = Grid(0, 0, n, n, 1, 1)
    zones = zone_table(
        [
            (1, "big", wkbio.rect_wkb(0.5, 0.5, 120.5, 120.5)),
            (2, "small", wkbio.rect_wkb(2.25, 2.25, 10.25, 10.25)),
        ]
    )

    exact = exact_extract(
        raster_from_array(vals, g, tile=32), zones, ["variety"]
    ).to_pandas().set_index("zone_id")["variety"]

    approx = zonal_variety_approx(
        raster_from_array(vals, g, tile=32), zones, k=1024
    ).set_index("zone_id")

    # small zone: fewer than k distinct -> exact, flagged exact
    assert bool(approx.loc[2, "exact"])
    assert approx.loc[2, "variety_est"] == exact.loc[2]
    # big zone: estimate within 10% (expected error ~ 3% at k=1024)
    assert not bool(approx.loc[1, "exact"])
    rel = abs(approx.loc[1, "variety_est"] - exact.loc[1]) / exact.loc[1]
    assert rel < 0.10, rel

    # tiling invariance: different tile size, same merged sketch result
    approx2 = zonal_variety_approx(
        raster_from_array(vals, g, tile=16), zones, k=1024
    ).set_index("zone_id")
    np.testing.assert_allclose(
        approx["variety_est"], approx2["variety_est"], rtol=0
    )


def test_zonal_quantile_hist(_ray):
    """Histogram-quantile sketch: within one bin width of the exact
    coverage-weighted median, tiling-invariant."""
    from exactextractr_ray.pipelines.sketch import zonal_quantile_hist
    from exactextractr_ray.pipelines.zonal import exact_extract
    from exactextractr_ray.sources.raster import raster_from_array
    from exactextractr_ray.sources.zones import zone_table

    n = 64
    rng = np.random.RandomState(4)
    vals = rng.rand(n, n)  # continuous in [0, 1)
    g = Grid(0, 0, n, n, 1, 1)
    zones = zone_table(
        [
            (1, "a", wkbio.rect_wkb(0.5, 0.5, 40.5, 40.5)),
            (2, "b", wkbio.circle_wkb(50, 20, 10, segments=90)),
        ]
    )
    bins = 512
    binw = 1.0 / bins

    exact = exact_extract(
        raster_from_array(vals, g, tile=16), zones, ["median"]
    ).to_pandas().set_index("zone_id")["median"]
    approx = zonal_quantile_hist(
        raster_from_array(vals, g, tile=16), zones, quantiles=[0.5],
        bins=bins, vmin=0.0, vmax=1.0,
    ).set_index("zone_id")["q50"]
    for z in (1, 2):
        assert abs(approx.loc[z] - exact.loc[z]) <= binw, z

    approx2 = zonal_quantile_hist(
        raster_from_array(vals, g, tile=32), zones, quantiles=[0.5],
        bins=bins, vmin=0.0, vmax=1.0,
    ).set_index("zone_id")["q50"]
    np.testing.assert_allclose(approx, approx2, rtol=0)
