"""Cost-distance wavefront fixpoint (pipelines/costdistance.py):
bit-exact vs single-process Dijkstra, multi-round propagation through
tile-crossing mazes, barriers, unreachable cells, multi-source."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from exactextractr_ray.grid import Grid
from exactextractr_ray.pipelines.costdistance import (
    INF,
    cost_distance,
    cost_distance_reference,
)
from exactextractr_ray.sources.raster import RasterDataset


def _raster_from_array(cost: np.ndarray, tile: int) -> RasterDataset:
    n = cost.shape[0]
    rows = []
    for ty in range(0, n, tile):
        for tx in range(0, n, tile):
            blk = cost[ty:ty + tile, tx:tx + tile]
            rows.append(
                {
                    "layer": "value",
                    "ty": ty // tile,
                    "tx": tx // tile,
                    "row0": ty,
                    "col0": tx,
                    "th": blk.shape[0],
                    "tw": blk.shape[1],
                    "values": blk.ravel().tolist(),
                }
            )
    grid = Grid(0.0, 0.0, float(n), float(n), 1.0, 1.0)
    return RasterDataset(
        ds=ray.data.from_items(rows), grid=grid, tile_h=tile, tile_w=tile
    )


def _check(cost, sources, tile, ray_session):
    got = cost_distance(_raster_from_array(cost, tile), sources)
    want = cost_distance_reference(cost, sources)
    wr, wc = np.nonzero(want < INF)
    wdf = (
        pd.DataFrame({"row": wr, "col": wc, "dist": want[wr, wc]})
        .sort_values(["row", "col"])
        .reset_index(drop=True)
    )
    assert got.equals(wdf)
    return got, want


def test_uniform_cost_is_chamfer_distance(ray_session):
    cost = np.ones((16, 16))
    got, want = _check(cost, [(0, 0)], 8, ray_session)
    # uniform cost 1: step cost 2*2=4 cardinal / 2*3=6 diagonal ->
    # chamfer-(2,3) distance x2: d(0,0)->(0,3) = 12, ->(2,2) = 12
    w = want
    assert w[0, 3] == 12 and w[2, 2] == 12 and w[1, 1] == 6


def test_spiral_maze_forces_many_rounds(ray_session):
    """A spiral barrier makes the optimal path wind through every tile
    several times — the fixpoint needs many halo rounds, not one."""
    n = 32
    cost = np.ones((n, n))
    # concentric rectangular walls with one gap each, alternating sides
    for k, ring in enumerate(range(2, n // 2, 4)):
        cost[ring, ring:n - ring] = np.nan
        cost[n - 1 - ring, ring:n - ring] = np.nan
        cost[ring:n - ring, ring] = np.nan
        cost[ring:n - ring, n - 1 - ring] = np.nan
        gap = ring if k % 2 == 0 else n - 1 - ring
        cost[gap, ring + 1] = 1.0  # punch a gap
    got, want = _check(cost, [(n // 2, n // 2)], 8, ray_session)
    assert (want < INF).sum() > 100  # maze interior reachable


def test_heterogeneous_cost_prefers_cheap_detour(ray_session):
    cost = np.ones((16, 16))
    cost[:, 8] = 100.0  # expensive wall column
    cost[0, 8] = 1.0    # cheap crossing at the top
    got, want = _check(cost, [(8, 0)], 8, ray_session)
    # crossing at (8,8) directly costs (1+100)*2 twice; the top detour is
    # long but cheap — verify the solver did NOT pay the direct wall cost
    direct = want[8, 7] + (1 + 100) * 2 + (100 + 1) * 2
    assert want[8, 9] < direct


def test_barriers_and_unreachable(ray_session):
    cost = np.ones((16, 16))
    cost[:, 5] = np.nan  # full barrier column
    got, want = _check(cost, [(3, 0)], 8, ray_session)
    assert np.all(want[:, 6:] == INF)  # right side unreachable
    assert not ((got["col"] >= 6).any())


def test_multi_source_and_zero_cost_rejected(ray_session):
    cost = np.full((16, 16), 2.0)
    cost[4, 4] = 0.0  # zero cost = barrier by contract
    got, want = _check(cost, [(0, 0), (15, 15)], 8, ray_session)
    assert want[4, 4] == INF
    assert want[0, 0] == 0 and want[15, 15] == 0


def test_ragged_tiles(ray_session):
    rng = np.random.default_rng(5)
    cost = rng.integers(1, 9, (20, 20)).astype(np.float64)
    _check(cost, [(1, 17)], 8, ray_session)  # 20 % 8 != 0 -> ragged edge


def test_least_cost_path_matches_reference(ray_session, tmp_path):
    from exactextractr_ray.pipelines.costdistance import (
        least_cost_path,
        least_cost_path_reference,
        write_state_partitioned,
    )

    rng = np.random.default_rng(9)
    cost = rng.integers(1, 9, (40, 40)).astype(np.float64)
    cost[10:30, 20] = np.nan  # wall with ends open -> path must detour
    raster = _raster_from_array(cost, 16)
    cells, state = cost_distance(raster, [(0, 0)], keep_state=True)
    write_state_partitioned(state, str(tmp_path / "state"))
    want_dist = cost_distance_reference(cost, [(0, 0)])
    tgt = (39, 39)
    got = least_cost_path(
        str(tmp_path / "state"), (40, 40), (16, 16), tgt
    )
    want = least_cost_path_reference(cost, want_dist, tgt)
    assert got == want
    assert got[0] == tgt and want_dist[got[-1]] == 0
    # dist strictly decreases along the path
    ds_ = [want_dist[p] for p in got]
    assert all(a > b for a, b in zip(ds_, ds_[1:]))


def test_least_cost_path_unreachable_target(ray_session, tmp_path):
    from exactextractr_ray.pipelines.costdistance import (
        least_cost_path,
        write_state_partitioned,
    )

    cost = np.ones((16, 16))
    cost[:, 8] = np.nan
    raster = _raster_from_array(cost, 8)
    _cells, state = cost_distance(raster, [(0, 0)], keep_state=True)
    write_state_partitioned(state, str(tmp_path / "state"))
    assert least_cost_path(
        str(tmp_path / "state"), (16, 16), (8, 8), (5, 12)
    ) == []


def test_all_sources_on_barriers_empty_result(ray_session):
    cost = np.ones((16, 16))
    cost[3, 3] = np.nan
    raster = _raster_from_array(cost, 8)
    out = cost_distance(raster, [(3, 3)])
    assert len(out) == 0 and list(out.columns) == ["row", "col", "dist"]
