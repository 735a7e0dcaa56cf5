"""Spatial-index operator tests: Hilbert key, hex binning, spatial kNN,
polygon cell cover, k-ring aggregation, raster run polygonize."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from exactextractr_ray import synth
from exactextractr_ray.stages.spatial import (
    hex_cell,
    hilbert_cell,
    zone_cell_cover_batch,
)


def _grid_lonlat(level: int):
    """One point in the middle of every 2^level x 2^level cell."""
    n = 1 << level
    xs, ys = np.meshgrid(np.arange(n), np.arange(n))
    lon = -180.0 + (xs.ravel() + 0.5) / n * 360.0
    lat = -90.0 + (ys.ravel() + 0.5) / n * 180.0
    return lon, lat, xs.ravel(), ys.ravel()


def test_hilbert_bijection_and_range():
    level = 4
    lon, lat, _, _ = _grid_lonlat(level)
    d = hilbert_cell(lon, lat, level)
    n2 = (1 << level) ** 2
    assert sorted(d.tolist()) == list(range(n2))


def test_hilbert_consecutive_cells_are_edge_adjacent():
    """The defining Hilbert property: walking d=0,1,2,... visits
    edge-adjacent cells (Morton does NOT satisfy this)."""
    level = 4
    lon, lat, xs, ys = _grid_lonlat(level)
    d = hilbert_cell(lon, lat, level)
    order = np.argsort(d)
    dx = np.abs(np.diff(xs[order]))
    dy = np.abs(np.diff(ys[order]))
    assert ((dx + dy) == 1).all()


def test_hilbert_prefix_coarsening():
    """Parent cell id at level-1 is d >> 2 (same contract as Morton)."""
    rng = np.random.default_rng(7)
    lon = rng.uniform(-180, 180, 500)
    lat = rng.uniform(-90, 90, 500)
    d8 = hilbert_cell(lon, lat, 8)
    d7 = hilbert_cell(lon, lat, 7)
    assert (d8 >> 2 == d7).all()


def test_hex_nearest_center_is_exact():
    """The 9-candidate argmin equals a brute-force 7x7 nearest-center
    search: the window is sufficient, the Voronoi assignment exact."""
    rng = np.random.default_rng(11)
    lon = rng.uniform(-179, 179, 2000)
    lat = rng.uniform(-89, 89, 2000)
    size = 4.0
    got = hex_cell(lon, lat, size)
    w = np.sqrt(3.0) * size
    ystep = 1.5 * size
    x = lon + 180.0
    y = lat + 90.0
    r0 = np.floor(y / ystep).astype(np.int64)
    c0 = np.floor(x / w).astype(np.int64)
    best_d2 = np.full(len(x), np.inf)
    best_id = np.zeros(len(x), dtype=np.int64)
    for dr in range(-3, 4):
        for dc in range(-3, 4):
            r = r0 + dr
            c = c0 + dc
            cx = c * w + np.mod(r, 2) * (w * 0.5)
            cy = r * ystep
            d2 = (x - cx) ** 2 + (y - cy) ** 2
            take = d2 < best_d2
            best_d2 = np.where(take, d2, best_d2)
            best_id = np.where(take, r * 1048576 + c, best_id)
    assert (got == best_id).all()


def test_hex_cells_partition_points():
    """Points inside one hexagon (sampled near a center) share its id."""
    size = 4.0
    w = np.sqrt(3.0) * size
    # center of hex (r=10, c=20)
    cx = 20 * w + 0 * (w * 0.5)
    cy = 10 * 1.5 * size
    rng = np.random.default_rng(3)
    # inradius = w/2; sample strictly inside the incircle
    rad = rng.uniform(0, 0.49 * w, 200)
    ang = rng.uniform(0, 2 * np.pi, 200)
    lon = cx + rad * np.cos(ang) - 180.0
    lat = cy + rad * np.sin(ang) - 90.0
    ids = hex_cell(lon, lat, size)
    assert (ids == 10 * 1048576 + 20).all()


def test_zone_cell_cover_matches_bruteforce():
    res = 3.0
    bounds = [synth.synth_geo_zone_bounds(k) for k in range(24)]
    tbl = pa.table(
        {
            "zone_id": pa.array(range(24), pa.int64()),
            "xmin": pa.array([b[0] for b in bounds], pa.float64()),
            "ymin": pa.array([b[1] for b in bounds], pa.float64()),
            "xmax": pa.array([b[2] for b in bounds], pa.float64()),
            "ymax": pa.array([b[3] for b in bounds], pa.float64()),
        }
    )
    out = zone_cell_cover_batch(tbl, res)
    got = set(zip(out["zone_id"].to_pylist(), out["cell"].to_pylist()))
    want = set()
    for k, (xmin, ymin, xmax, ymax) in enumerate(bounds):
        for cy in range(60):
            for cx in range(120):
                x0, x1 = cx * res - 180.0, (cx + 1) * res - 180.0
                y0, y1 = cy * res - 90.0, (cy + 1) * res - 90.0
                if x0 < xmax and x1 > xmin and y0 < ymax and y1 > ymin:
                    want.add((k, cy * 120 + cx))
    assert got == want


def test_spatial_knn_matches_bruteforce(ray_session):
    import ray.data
    from exactextractr_ray.stages.spatial import spatial_knn

    ids = np.arange(300, dtype=np.int64)
    lon, lat = synth.geocode_ids(ids)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "lon": pa.array(lon, pa.float64()),
                "lat": pa.array(lat, pa.float64()),
            }
        )
    ).repartition(7)
    qids = 11 + 37 * np.arange(4, dtype=np.int64)
    qlon, qlat = synth.geocode_ids(qids)
    out = spatial_knn(ds, qids, qlon, qlat, k=5).to_pandas()
    for qi, q in enumerate(qids):
        d2 = (lon - qlon[qi]) ** 2 + (lat - qlat[qi]) ** 2
        mask = ids != q
        order = np.lexsort((ids[mask], d2[mask]))[:5]
        want_ids = ids[mask][order]
        got = out[out["query_id"] == q].sort_values("rank")
        assert got["neighbor_id"].tolist() == want_ids.tolist()
        assert np.array_equal(got["dist2"].to_numpy(), d2[mask][order])


def test_spatial_knn_cells_equals_bruteforce(ray_session, tmp_path):
    """The ring-pruned index path is EXACT: equals spatial_knn bit-for-bit,
    and the pruning really skips partitions."""
    import ray.data
    from exactextractr_ray.stages.spatial import (
        build_cell_index,
        spatial_knn,
        spatial_knn_cells,
    )

    ids = np.arange(600, dtype=np.int64)
    lon, lat = synth.geocode_ids(ids)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "lon": pa.array(lon, pa.float64()),
                "lat": pa.array(lat, pa.float64()),
            }
        )
    ).repartition(6)
    idx = str(tmp_path / "cellidx")
    build_cell_index(ds, idx, res_deg=3.0)
    qids = 11 + 37 * np.arange(5, dtype=np.int64)
    qlon, qlat = synth.geocode_ids(qids)
    brute = (
        spatial_knn(ds, qids, qlon, qlat, k=5)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    pruned = (
        spatial_knn_cells(idx, qids, qlon, qlat, k=5, res_deg=3.0)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    for c in brute.columns:
        assert np.array_equal(
            brute[c].to_numpy(), pruned[c].to_numpy()
        ), c


def test_spatial_knn_cells_small_corpus(ray_session, tmp_path):
    """k exceeding the corpus: every point is scanned, exact result."""
    import ray.data
    from exactextractr_ray.stages.spatial import (
        build_cell_index,
        spatial_knn_cells,
    )

    ids = np.arange(3, dtype=np.int64)
    lon, lat = synth.geocode_ids(ids)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "lon": pa.array(lon, pa.float64()),
                "lat": pa.array(lat, pa.float64()),
            }
        )
    )
    idx = str(tmp_path / "tinyidx")
    build_cell_index(ds, idx, res_deg=3.0)
    out = (
        spatial_knn_cells(idx, np.array([100]), lon[:1] + 0.5, lat[:1] + 0.5, k=5)
        .to_pandas()
        .sort_values("rank")
    )
    assert out["neighbor_id"].nunique() == 3  # all points returned, ranked


def test_pip_join_cells_equals_bruteforce(ray_session):
    """Cover-join output equals a direct strict-interior test over every
    (point, zone) pair."""
    import ray.data
    from exactextractr_ray.stages.spatial import pip_join_cells

    ids = np.arange(400, dtype=np.int64)
    lon, lat = synth.geocode_ids(ids)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "lon": pa.array(lon, pa.float64()),
                "lat": pa.array(lat, pa.float64()),
            }
        )
    ).repartition(5)
    nz = 24
    bounds = [synth.synth_geo_zone_bounds(k) for k in range(nz)]
    tbl = pa.table(
        {
            "zone_id": pa.array(range(nz), pa.int64()),
            "xmin": pa.array([b[0] for b in bounds], pa.float64()),
            "ymin": pa.array([b[1] for b in bounds], pa.float64()),
            "xmax": pa.array([b[2] for b in bounds], pa.float64()),
            "ymax": pa.array([b[3] for b in bounds], pa.float64()),
        }
    )
    got = (
        pip_join_cells(ds, tbl)
        .select_columns(["doc_id", "zone_id"])
        .to_pandas()
        .sort_values(["doc_id", "zone_id"])
        .reset_index(drop=True)
    )
    want = []
    for k, (x0, y0, x1, y1) in enumerate(bounds):
        m = (lon > x0) & (lon < x1) & (lat > y0) & (lat < y1)
        for d in ids[m]:
            want.append((int(d), k))
    want = sorted(want)
    assert list(zip(got["doc_id"], got["zone_id"])) == want


def test_cell_kring_bruteforce(ray_session):
    import ray.data
    from exactextractr_ray.stages.spatial import cell_kring_counts

    ids = np.arange(400, dtype=np.int64)
    lon, lat = synth.geocode_ids(ids)
    cells = synth.cell_for_lonlat(lon, lat, 3.0)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "cell": pa.array(cells, pa.int64()),
            }
        )
    ).repartition(5)
    out = cell_kring_counts(ds, 3.0).to_pandas().sort_values("cell")
    from collections import Counter

    counts = Counter(cells.tolist())
    for _, row in out.iterrows():
        cell = int(row["cell"])
        cy, cx = cell // 120, cell % 120
        assert row["n_docs"] == counts[cell]
        want = sum(
            counts.get((cy + dy) * 120 + (cx + dx), 0)
            for dy in (-1, 0, 1)
            for dx in (-1, 0, 1)
        )
        assert row["kring_docs"] == want
    assert set(out["cell"]) == set(counts)


def test_spatial_ops_empty_inputs(ray_session):
    """Every spatial/window/graph operator added this wave must survive a
    0-row input — empty partitions are routine at scale."""
    import pandas as pd
    import ray.data
    from exactextractr_ray.stages.events import moving_avg
    from exactextractr_ray.stages.graph import triangle_counts
    from exactextractr_ray.stages.spatial import (
        cell_kring_counts,
        pip_join_cells,
        spatial_knn,
        zone_cell_cover,
    )

    pts = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "lon": pa.array([], pa.float64()),
                "lat": pa.array([], pa.float64()),
            }
        )
    )
    qids = np.array([1, 2], dtype=np.int64)
    qlon, qlat = synth.geocode_ids(qids)
    assert spatial_knn(pts, qids, qlon, qlat, k=3).count() == 0

    cells = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([], pa.int64()), "cell": pa.array([], pa.int64())})
    )
    assert cell_kring_counts(cells).count() == 0

    zb = pa.table(
        {
            "zone_id": pa.array([], pa.int64()),
            "xmin": pa.array([], pa.float64()),
            "ymin": pa.array([], pa.float64()),
            "xmax": pa.array([], pa.float64()),
            "ymax": pa.array([], pa.float64()),
        }
    )
    assert zone_cell_cover(ray.data.from_arrow(zb)).count() == 0
    assert pip_join_cells(pts, zb).count() == 0  # empty zones AND points

    edges = ray.data.from_arrow(
        pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
    )
    assert triangle_counts(edges).count() == 0

    ev = ray.data.from_arrow(
        pa.table(
            {
                "event_id": pa.array([], pa.int64()),
                "user_id": pa.array([], pa.int64()),
                "ts": pa.array([], pa.timestamp("us")),
                "value": pa.array([], pa.float64()),
            }
        )
    )
    assert moving_avg(ev).count() == 0


def test_raster_runs_reconstruct_and_maximal(ray_session):
    from exactextractr_ray.pipelines.polygonize import raster_runs
    from exactextractr_ray.sources.raster import synthetic_raster_dataset

    n, tile = 64, 16
    rds = synthetic_raster_dataset(n=n, tile=tile)
    out = raster_runs(rds).to_pandas().sort_values(["row", "col_start"])
    rows = np.arange(n)
    full = synth.synth_values(*np.meshgrid(rows, rows, indexing="ij"))
    # reconstruct: every run paints its value; NaN cells stay NaN
    recon = np.full((n, n), np.nan)
    for _, r in out.iterrows():
        recon[int(r["row"]), int(r["col_start"]) : int(r["col_end"]) + 1] = r["val"]
    want = full
    assert np.array_equal(np.isnan(recon), np.isnan(want))
    assert np.array_equal(recon[~np.isnan(want)], want[~np.isnan(want)])
    # maximality: no two adjacent same-value runs in one row
    prev = None
    for _, r in out.iterrows():
        cur = (int(r["row"]), int(r["col_start"]), int(r["col_end"]), r["val"])
        if prev and prev[0] == cur[0] and prev[2] + 1 == cur[1]:
            assert prev[3] != cur[3]
        prev = cur
    assert (out["run_len"] == out["col_end"] - out["col_start"] + 1).all()


def test_distance_join_bruteforce(ray_session):
    """Cell-binned radius join == brute cross join, at several radii
    including radius == cell size (the tight guarantee boundary)."""
    import ray.data

    from exactextractr_ray.stages.spatial import distance_join

    rng = np.random.default_rng(7)
    na, nb = 300, 40
    alon = rng.uniform(-170, 170, na)
    alat = rng.uniform(-55, 55, na)
    aids = np.arange(na, dtype=np.int64)
    bsel = rng.choice(na, nb, replace=False)
    a_ds = ray.data.from_arrow(
        pa.table({"doc_id": aids, "lon": alon, "lat": alat})
    )
    b_ds = ray.data.from_arrow(
        pa.table(
            {"qid": aids[bsel], "lon": alon[bsel], "lat": alat[bsel]}
        )
    )
    for radius, res in [(12.0, 12.0), (5.0, 8.0), (20.0, 20.0)]:
        df = (
            distance_join(a_ds, b_ds, radius=radius, res_deg=res)
            .to_pandas()
            .sort_values(["doc_id", "qid"])
            .reset_index(drop=True)
        )
        dlon = alon[:, None] - alon[bsel][None, :]
        dlat = alat[:, None] - alat[bsel][None, :]
        d2 = dlon * dlon + dlat * dlat
        hit = (d2 <= radius * radius) & (aids[:, None] != aids[bsel][None, :])
        ai, bi = np.nonzero(hit)
        exp = sorted(zip(aids[ai], aids[bsel][bi], d2[ai, bi]))
        got = list(zip(df["doc_id"], df["qid"], df["dist2"]))
        assert len(got) == len(exp), (radius, len(got), len(exp))
        for (ga, gb, gd), (ea, eb, ed) in zip(got, exp):
            assert (ga, gb) == (ea, eb)
            assert gd == ed  # bit-exact
    # pair uniqueness is implied by count equality vs brute force


def test_distance_join_rejects_radius_above_cell(ray_session):
    import ray.data

    from exactextractr_ray.stages.spatial import distance_join

    t = pa.table(
        {"doc_id": pa.array([0], pa.int64()), "lon": [0.0], "lat": [0.0]}
    )
    q = pa.table({"qid": pa.array([1], pa.int64()), "lon": [1.0], "lat": [1.0]})
    with pytest.raises(ValueError):
        distance_join(
            ray.data.from_arrow(t), ray.data.from_arrow(q), radius=10.0, res_deg=5.0
        )


def test_distance_join_empty_sides(ray_session):
    import ray.data

    from exactextractr_ray.stages.spatial import distance_join

    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "lon": pa.array([], pa.float64()),
            "lat": pa.array([], pa.float64()),
        }
    )
    pts = pa.table(
        {"qid": pa.array([1], pa.int64()), "lon": [0.0], "lat": [0.0]}
    )
    out = distance_join(
        ray.data.from_arrow(empty), ray.data.from_arrow(pts), radius=5.0
    ).to_pandas()
    assert len(out) == 0


def _brute_components(full: np.ndarray):
    """BFS 4-adjacency CCL; returns {min_run_id: (val, n_cells)}."""
    from collections import deque

    n = full.shape[0]
    lab = np.zeros(full.shape, bool)
    comps = {}
    for i in range(n):
        for j in range(full.shape[1]):
            if np.isnan(full[i, j]) or lab[i, j]:
                continue
            q = deque([(i, j)])
            lab[i, j] = True
            cells = [(i, j)]
            v = full[i, j]
            while q:
                y, x = q.popleft()
                for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                    yy, xx = y + dy, x + dx
                    if (
                        0 <= yy < n
                        and 0 <= xx < full.shape[1]
                        and not lab[yy, xx]
                        and full[yy, xx] == v
                    ):
                        lab[yy, xx] = True
                        q.append((yy, xx))
                        cells.append((yy, xx))
            cellset = set(cells)
            rids = []
            for y, x in cells:
                x0 = x
                while (y, x0 - 1) in cellset:
                    x0 -= 1
                rids.append(y * full.shape[1] + x0)
            comps[min(rids)] = (v, len(cells))
    return comps


@pytest.mark.parametrize(
    "n,tile,band_rows,divisor",
    [(64, 16, 16, 500.0), (50, 16, 8, 100.0), (32, 8, 4, 500.0)],
)
def test_raster_components_bruteforce(ray_session, n, tile, band_rows, divisor):
    """Run-based distributed CCL == BFS, incl. ragged tiles and band sizes
    that force cross-band label propagation."""
    from exactextractr_ray.pipelines.polygonize import (
        quantize_raster,
        raster_components,
    )
    from exactextractr_ray.sources.raster import synthetic_raster_dataset

    rd = quantize_raster(
        synthetic_raster_dataset(n=n, tile=tile, dtype=np.float64), divisor
    )
    df = raster_components(rd, band_rows=band_rows).to_pandas()
    got = {
        int(k): (v, int(c))
        for k, v, c in zip(df["component_id"], df["val"], df["n_cells"])
    }
    r, c = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    exp = _brute_components(np.floor(synth.synth_values(r, c) / divisor))
    assert got == exp
    assert int(df["n_runs"].sum()) >= len(df)


def test_raster_components_no_vertical_merges(ray_session):
    """Unquantized synth raster: vertical neighbors never match, so every
    run is its own component (the zero-edge path through dup_clusters)."""
    from exactextractr_ray.pipelines.polygonize import (
        raster_components,
        raster_runs,
    )
    from exactextractr_ray.sources.raster import synthetic_raster_dataset

    rd = synthetic_raster_dataset(n=32, tile=8, dtype=np.float64)
    comps = raster_components(rd).to_pandas()
    nruns = raster_runs(rd).to_pandas()
    assert len(comps) == len(nruns)
    assert (comps["n_runs"] == 1).all()


def test_distance_join_hot_cell_skew(ray_session):
    """Every point in ONE cell (the worst skew): correctness holds, the
    hot group is a single |A|x|B| vectorized mask."""
    import ray.data

    from exactextractr_ray.stages.spatial import distance_join

    rng = np.random.default_rng(3)
    na = 400
    lon = rng.uniform(0.0, 0.9, na)
    lat = rng.uniform(0.0, 0.9, na)
    ids = np.arange(na, dtype=np.int64)
    a = ray.data.from_arrow(pa.table({"doc_id": ids, "lon": lon, "lat": lat}))
    b = ray.data.from_arrow(
        pa.table({"qid": ids[:5], "lon": lon[:5], "lat": lat[:5]})
    )
    df = distance_join(a, b, radius=1.0, res_deg=1.0).to_pandas()
    d2 = (lon[:, None] - lon[:5][None, :]) ** 2 + (
        lat[:, None] - lat[:5][None, :]
    ) ** 2
    exp = int(((d2 <= 1.0) & (ids[:, None] != ids[:5][None, :])).sum())
    assert len(df) == exp
    assert exp > 0.9 * 5 * (na - 1)  # nearly all pairs: one hot group


def test_raster_components_single_giant_component(ray_session):
    """Constant-class raster: components = NaN-separated regions with
    diameters ~2n, forcing multiple Hash-to-Min propagation rounds across
    every band boundary."""
    from exactextractr_ray.pipelines.polygonize import (
        quantize_raster,
        raster_components,
    )
    from exactextractr_ray.sources.raster import synthetic_raster_dataset

    n = 48
    rd = quantize_raster(
        synthetic_raster_dataset(n=n, tile=8, dtype=np.float64), 1e9
    )
    df = raster_components(rd, band_rows=4).to_pandas()
    r, c = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    exp = _brute_components(
        np.floor(synth.synth_values(r, c) / 1e9)
    )
    got = {
        int(k): (v, int(cc))
        for k, v, cc in zip(df["component_id"], df["val"], df["n_cells"])
    }
    assert got == exp
    # the dominant component must span nearly the whole raster
    assert max(c for _, c in exp.values()) > 0.8 * n * n


def test_nearest_zone_bruteforce(ray_session):
    """Clamp-distance snap vs brute force, incl. inside-zone dist 0 and
    tie-break to the smallest zone_id."""
    import ray.data

    from exactextractr_ray.stages.spatial import nearest_zone

    rng = np.random.default_rng(11)
    pts = pa.table(
        {
            "doc_id": pa.array(np.arange(200, dtype=np.int64)),
            "lon": rng.uniform(-180, 180, 200),
            "lat": rng.uniform(-60, 60, 200),
        }
    )
    # two identical zones (0, 1) force ties -> zone 0 must win
    zb = [
        (0, -10.0, -10.0, 10.0, 10.0),
        (1, -10.0, -10.0, 10.0, 10.0),
        (2, 50.0, 20.0, 80.0, 40.0),
    ]
    df = (
        nearest_zone(ray.data.from_arrow(pts), zb)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    lon = pts.column("lon").to_numpy()
    lat = pts.column("lat").to_numpy()
    for i in range(200):
        best = None
        for z, x0, y0, x1, y1 in zb:
            dx = max(0.0, x0 - lon[i], lon[i] - x1)
            dy = max(0.0, y0 - lat[i], lat[i] - y1)
            d2 = dx * dx + dy * dy
            if best is None or d2 < best[0]:
                best = (d2, z)
        assert df["zone_id"][i] == best[1]
        assert df["dist2"][i] == best[0]
    inside = df["dist2"] == 0.0
    assert inside.any()
    assert (df.loc[inside & (df["zone_id"] < 2), "zone_id"] == 0).all()


def test_nearest_zone_empty_zones_rejected(ray_session):
    import ray.data

    from exactextractr_ray.stages.spatial import nearest_zone

    pts = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([0], pa.int64()), "lon": [0.0], "lat": [0.0]})
    )
    with pytest.raises(ValueError):
        nearest_zone(pts, [])
