"""Raster sieve (pipelines/sieve.py): cell-exact vs the single-process
BFS reference, GDAL smallest-first-with-recontraction semantics,
isolated small regions, NaN background, tile-crossing regions."""

import numpy as np
import pytest

from exactextractr_ray.pipelines.sieve import (
    _sieve_merge_plan,
    runs_to_array,
    sieve_raster,
    sieve_reference,
)
from tests.test_costdistance import _raster_from_array


def _assert_matches(cost, threshold, tile, ray_session):
    got = runs_to_array(
        sieve_raster(_raster_from_array(cost, tile), threshold),
        cost.shape,
    )
    want = sieve_reference(cost, threshold)
    assert np.array_equal(np.isnan(got), np.isnan(want))
    assert np.array_equal(got[~np.isnan(got)], want[~np.isnan(want)])
    return want


def test_speckle_cleanup(ray_session):
    rng = np.random.default_rng(2)
    base = rng.integers(0, 3, (6, 6)).astype(np.float64)
    cost = np.repeat(np.repeat(base, 8, 0), 8, 1)
    noise = rng.random((48, 48)) < 0.06
    cost[noise] = rng.integers(5, 8, int(noise.sum())).astype(np.float64)
    cost[0:3, 40:43] = np.nan
    want = _assert_matches(cost, 20, 16, ray_session)
    # all speckle values are gone; only the base classes remain
    assert set(np.unique(want[np.isfinite(want)])) <= {0.0, 1.0, 2.0}


def test_region_crossing_tiles_survives(ray_session):
    cost = np.zeros((32, 32))
    cost[14:18, :] = 7.0  # a 4x32 stripe crossing both tile rows
    want = _assert_matches(cost, 50, 16, ray_session)
    assert np.all(want[15] == 7.0)  # 128 cells >= 50: survives


def test_isolated_small_region_keeps_value(ray_session):
    cost = np.full((16, 16), np.nan)
    cost[4:6, 4:6] = 3.0  # small but has NO neighbor (NaN background)
    want = _assert_matches(cost, 10, 8, ray_session)
    assert np.all(want[4:6, 4:6] == 3.0)


def test_recontraction_lifts_absorber():
    """Merging a into b can push b over the threshold: plan must then
    leave b alone (smallest-first with recontraction)."""
    sizes = {1: 2, 2: 4, 3: 100}
    borders = {(1, 2): 1, (2, 3): 1}
    plan = _sieve_merge_plan(dict(sizes), dict(borders), threshold=6)
    # 1 (smallest) merges into 2 (its only neighbor) -> 2 has 6 >= 6
    assert plan[1] == 2 and plan[2] == 2 and plan[3] == 3


def test_chain_merge_into_large():
    sizes = {1: 1, 2: 2, 3: 100}
    borders = {(1, 2): 1, (2, 3): 1}
    plan = _sieve_merge_plan(dict(sizes), dict(borders), threshold=50)
    # 1 -> 2 (only neighbor), then 2 (size 3 < 50) -> 3
    assert plan[1] == 3 and plan[2] == 3


def test_tie_break_largest_then_smallest_id():
    sizes = {5: 1, 2: 10, 9: 10}
    borders = {(2, 5): 1, (5, 9): 1}
    plan = _sieve_merge_plan(dict(sizes), dict(borders), threshold=2)
    assert plan[5] == 2  # equal sizes -> smaller component id wins


def test_checkerboard_all_small_collapses(ray_session):
    """2x2 checkerboard blocks below threshold: everything merges; the
    result must still match the reference exactly (order-sensitive)."""
    base = np.indices((8, 8)).sum(axis=0) % 2
    cost = np.repeat(np.repeat(base.astype(np.float64), 2, 0), 2, 1)
    _assert_matches(cost, 5, 8, ray_session)


def test_fillnodata_matches_bruteforce(ray_session):
    """8-ray donor search vs a brute-force per-hole loop, exact
    integer rationals; max_dist bound respected."""
    from exactextractr_ray.pipelines.interpolate import (
        _FILL_DIRS,
        fillnodata,
    )

    rng = np.random.default_rng(4)
    cost = rng.integers(0, 100, (32, 32)).astype(np.float64)
    holes = rng.random((32, 32)) < 0.15
    cost[holes] = np.nan
    cost[10:19, 10:19] = np.nan  # a 9x9 hole: its center exceeds k=3
    k = 3
    out = (
        fillnodata(_raster_from_array(cost, 16), max_dist=k)
        .to_pandas()
        .sort_values(["row", "col"])
        .reset_index(drop=True)
    )
    valid = np.isfinite(cost)
    want = []
    for r, c in np.argwhere(~valid):
        ds_, vs = [], []
        for dy, dx in _FILL_DIRS:
            for s in range(1, k + 1):
                nr, nc = r + dy * s, c + dx * s
                if 0 <= nr < 32 and 0 <= nc < 32 and valid[nr, nc]:
                    ds_.append(s)
                    vs.append(int(cost[nr, nc]))
                    break
        if ds_:
            D = int(np.prod(ds_))
            w = [D // d for d in ds_]
            want.append(
                (int(r), int(c),
                 sum(v * wi for v, wi in zip(vs, w)), sum(w))
            )
    got = [tuple(int(v) for v in t)
           for t in out[["row", "col", "num", "den"]].itertuples(index=False)]
    assert got == want
    # fill_val is the single exact division
    assert np.allclose(out["fill_val"], out["num"] / out["den"], rtol=0,
                       atol=0)
    # the hole's center is > k steps from any valid cell on all 8 rays
    assert (14, 14) not in {(r, c) for r, c, *_ in got}


def test_focal_morphology(ray_session):
    """Erosion/dilation/gradient vs brute-force windows; NaN skipped;
    broadcast and shuffle plans identical on ragged grids."""
    from exactextractr_ray.pipelines.focal import focal_minmax_3x3

    rng = np.random.default_rng(8)
    cost = rng.integers(0, 50, (20, 20)).astype(np.float64)
    cost[rng.random((20, 20)) < 0.1] = np.nan
    rd = _raster_from_array(cost, 8)
    got = (
        focal_minmax_3x3(rd).to_pandas().sort_values("cell")
        .reset_index(drop=True)
    )
    pad = np.full((22, 22), np.nan)
    pad[1:21, 1:21] = cost
    for i, (r, c) in enumerate(
        (r, c) for r in range(20) for c in range(20)
    ):
        win = pad[r:r + 3, c:c + 3]
        ok = np.isfinite(win)
        row = got.iloc[i]
        if ok.any():
            assert row["focal_min"] == np.min(win[ok])
            assert row["focal_max"] == np.max(win[ok])
            assert row["morph_gradient"] == np.max(win[ok]) - np.min(win[ok])
        else:
            assert np.isnan(row["focal_min"]) and np.isnan(row["focal_max"])
    # both physical plans agree on a ragged grid
    shuf = (
        focal_minmax_3x3(rd, broadcast_cap=0).to_pandas()
        .sort_values("cell").reset_index(drop=True)
    )
    assert got.equals(shuf)


def test_cli_raster_tools_e2e(ray_session, tmp_path):
    """terrain CLI: sieve to .tif (byte-compared vs the reference
    semantics), morphology + costdist to parquet — gdal-utility
    command-line parity over a real GeoTIFF."""
    import os

    from exactextractr_ray.cli import main as cli_main
    from exactextractr_ray.grid import Grid
    from exactextractr_ray.pipelines.sieve import sieve_reference
    from exactextractr_ray.sources.geotiff import read_geotiff, write_geotiff

    rng = np.random.default_rng(3)
    base = rng.integers(0, 3, (4, 4)).astype(np.float64)
    arr = np.repeat(np.repeat(base, 8, 0), 8, 1)
    arr[rng.random((32, 32)) < 0.05] = 9.0
    g = Grid(0.0, 0.0, 32.0, 32.0, 1.0, 1.0)
    tif = str(tmp_path / "in.tif")
    write_geotiff(arr, g, tif)

    out_tif = str(tmp_path / "sieved.tif")
    assert cli_main(["terrain", "-r", tif, "--op", "sieve",
                     "--threshold", "10", "-o", out_tif,
                     "--tile", "16"]) == 0
    got, _meta = read_geotiff(out_tif)
    want = sieve_reference(arr, 10)
    assert np.array_equal(got[~np.isnan(want)], want[~np.isnan(want)])

    out_pq = str(tmp_path / "dilate.parquet")
    assert cli_main(["terrain", "-r", tif, "--op", "dilate",
                     "-o", out_pq, "--tile", "16"]) == 0
    assert os.path.isdir(out_pq)

    out_cd = str(tmp_path / "cd.parquet")
    assert cli_main(["terrain", "-r", tif, "--op", "costdist",
                     "--source", "0,0;31,31", "-o", out_cd,
                     "--tile", "16"]) == 0
    assert os.path.isdir(out_cd)

    # fillnodata .tif = original with holes patched
    arr2 = arr.copy()
    arr2[5, 5] = np.nan
    tif2 = str(tmp_path / "holes.tif")
    write_geotiff(arr2, g, tif2)
    out_fill = str(tmp_path / "filled.tif")
    assert cli_main(["terrain", "-r", tif2, "--op", "fillnodata",
                     "--max-dist", "4", "-o", out_fill,
                     "--tile", "16"]) == 0
    filled, _m = read_geotiff(out_fill)
    assert np.isfinite(filled[5, 5])  # hole patched
    keep = np.isfinite(arr2)
    assert np.array_equal(filled[keep], arr2[keep])  # others untouched


def test_morans_i(ray_session):
    """Moran's I: gradient strongly positive, checkerboard exactly -1,
    brute-force parity with NaN holes, broadcast==shuffle plans."""
    from exactextractr_ray.pipelines.focal import morans_i

    g = np.add.outer(np.arange(24), np.arange(24)).astype(np.float64)
    assert morans_i(_raster_from_array(g, 8)).iloc[0]["moran_i"] > 0.9
    cb = (np.indices((24, 24)).sum(axis=0) % 2 * 10).astype(np.float64)
    assert morans_i(_raster_from_array(cb, 8)).iloc[0]["moran_i"] == -1.0

    rng = np.random.default_rng(3)
    a = rng.integers(0, 9, (16, 16)).astype(np.float64)
    a[rng.random((16, 16)) < 0.1] = np.nan
    got = morans_i(_raster_from_array(a, 8)).iloc[0]
    m = ~np.isnan(a)
    xs = a[m]
    n = len(xs)
    mean = xs.mean()
    num = 0.0
    W = 0
    for r in range(16):
        for c in range(16):
            if not m[r, c]:
                continue
            for dr, dc in ((0, 1), (1, 0), (0, -1), (-1, 0)):
                rr, cc = r + dr, c + dc
                if 0 <= rr < 16 and 0 <= cc < 16 and m[rr, cc]:
                    num += (a[r, c] - mean) * (a[rr, cc] - mean)
                    W += 1
    ref = (n / W) * num / ((xs - mean) ** 2).sum()
    assert abs(got["moran_i"] - ref) < 1e-12
    shuf = morans_i(_raster_from_array(a, 8), broadcast_cap=0).iloc[0]
    assert shuf["moran_i"] == got["moran_i"]


def test_gearys_c(ray_session):
    """Geary's C brute-force parity with NaN holes; gradient << 1,
    checkerboard near 2; plan identity."""
    from exactextractr_ray.pipelines.focal import gearys_c

    rng = np.random.default_rng(3)
    a = rng.integers(0, 9, (16, 16)).astype(np.float64)
    a[rng.random((16, 16)) < 0.1] = np.nan
    got = gearys_c(_raster_from_array(a, 8)).iloc[0]
    m = ~np.isnan(a)
    xs = a[m]
    n = len(xs)
    num = 0.0
    W = 0
    for r in range(16):
        for c in range(16):
            if not m[r, c]:
                continue
            for dr, dc in ((0, 1), (1, 0), (0, -1), (-1, 0)):
                rr, cc = r + dr, c + dc
                if 0 <= rr < 16 and 0 <= cc < 16 and m[rr, cc]:
                    num += (a[r, c] - a[rr, cc]) ** 2
                    W += 1
    ref = ((n - 1) / (2 * W)) * num / ((xs - xs.mean()) ** 2).sum()
    assert abs(got["geary_c"] - ref) < 1e-12
    g = np.add.outer(np.arange(24), np.arange(24)).astype(np.float64)
    assert gearys_c(_raster_from_array(g, 8)).iloc[0]["geary_c"] < 0.1
    cb = (np.indices((24, 24)).sum(axis=0) % 2 * 10).astype(np.float64)
    assert gearys_c(_raster_from_array(cb, 8)).iloc[0]["geary_c"] > 1.9
    shuf = gearys_c(_raster_from_array(a, 8), broadcast_cap=0).iloc[0]
    assert shuf["geary_c"] == got["geary_c"]


def test_getis_ord_g(ray_session):
    from exactextractr_ray.pipelines.focal import getis_ord_g

    rng = np.random.default_rng(3)
    a = rng.integers(1, 9, (16, 16)).astype(np.float64)
    a[rng.random((16, 16)) < 0.1] = np.nan
    got = getis_ord_g(_raster_from_array(a, 8)).iloc[0]
    m = ~np.isnan(a)
    num = 0.0
    for r in range(16):
        for c in range(16):
            if not m[r, c]:
                continue
            for dr, dc in ((0, 1), (1, 0), (0, -1), (-1, 0)):
                rr, cc = r + dr, c + dc
                if 0 <= rr < 16 and 0 <= cc < 16 and m[rr, cc]:
                    num += a[r, c] * a[rr, cc]
    xs = a[m]
    ref = num / (xs.sum() ** 2 - (xs ** 2).sum())
    assert abs(got["general_g"] - ref) < 1e-12
    shuf = getis_ord_g(_raster_from_array(a, 8), broadcast_cap=0).iloc[0]
    assert shuf["general_g"] == got["general_g"]


def test_local_morans_and_join_counts(ray_session):
    """LISA per-cell brute-force parity; sum identity vs global Moran
    numerator; join counts brute-force + total identity."""
    from exactextractr_ray.pipelines.focal import (
        join_counts,
        local_morans_i,
        morans_i,
    )

    rng = np.random.default_rng(3)
    a = rng.integers(0, 9, (16, 16)).astype(np.float64)
    a[rng.random((16, 16)) < 0.1] = np.nan
    rd = _raster_from_array(a, 8)
    df = local_morans_i(rd).to_pandas().sort_values("cell")
    m = ~np.isnan(a)
    xs = a[m]
    mean = xs.mean()
    m2 = ((xs - mean) ** 2).sum() / len(xs)
    for cell in (5 * 16 + 5, 0, 12 * 16 + 9):
        r, c = divmod(cell, 16)
        if not m[r, c]:
            continue
        znb = sum(
            a[rr, cc] - mean
            for rr, cc in ((r, c + 1), (r, c - 1), (r + 1, c), (r - 1, c))
            if 0 <= rr < 16 and 0 <= cc < 16 and m[rr, cc]
        )
        ref = (a[r, c] - mean) * znb / m2
        got = df[df["cell"] == cell].iloc[0]["local_i"]
        assert abs(got - ref) < 1e-9
    # sum of zi*znbr equals twice the global Moran numerator
    glob = morans_i(rd).iloc[0]
    assert int((df["zi"] * df["znbr_sum"]).sum()) == 2 * int(glob["num"])

    jc = join_counts(rd, threshold=5.0).iloc[0]
    bb = ww = bw = total = 0
    for r in range(16):
        for c in range(16):
            for dr, dc in ((0, 1), (1, 0)):
                rr, cc = r + dr, c + dc
                if rr < 16 and cc < 16 and m[r, c] and m[rr, cc]:
                    total += 1
                    x, y = a[r, c] >= 5, a[rr, cc] >= 5
                    bb += x and y
                    ww += (not x) and (not y)
                    bw += x != y
    assert (int(jc["bb"]), int(jc["ww"]), int(jc["bw"])) == (bb, ww, bw)
    assert int(jc["bb"] + jc["ww"] + jc["bw"]) == total


def test_semivariogram(ray_session):
    from exactextractr_ray.pipelines.focal import semivariogram

    rng = np.random.default_rng(3)
    a = rng.integers(0, 9, (20, 20)).astype(np.float64)
    a[rng.random((20, 20)) < 0.1] = np.nan
    df = semivariogram(_raster_from_array(a, 8), max_lag=3)
    m = ~np.isnan(a)
    for h in (1, 2, 3):
        n_p = 0
        s_p = 0.0
        for r in range(20):
            for c in range(20):
                if not m[r, c]:
                    continue
                for dr, dc in ((0, h), (h, 0)):
                    rr, cc = r + dr, c + dc
                    if rr < 20 and cc < 20 and m[rr, cc]:
                        n_p += 1
                        s_p += (a[r, c] - a[rr, cc]) ** 2
        row = df[df["lag"] == h].iloc[0]
        assert int(row["n_pairs"]) == n_p
        assert int(row["sq_sum"]) == int(s_p)
        assert row["gamma"] == s_p / (2.0 * n_p)
    g = np.add.outer(np.arange(24), np.arange(24)).astype(np.float64)
    dg = semivariogram(_raster_from_array(g, 8), max_lag=3)
    assert (dg["gamma"].to_numpy()[:-1] < dg["gamma"].to_numpy()[1:]).all()
