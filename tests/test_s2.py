"""S2 cell ids (stages/s2.py): geometric invariants for the lon/lat
front-end (libm-dependent, so not under the SQL oracle) plus the exact
integer machinery the `s2_cells` driver query relies on."""

import numpy as np
import pyarrow as pa
import pytest

from exactextractr_ray import synth
from exactextractr_ray.stages.s2 import (
    LOOKUP_IJ,
    LOOKUP_POS,
    MAX_LEVEL,
    assign_s2_batch,
    assign_s2_xyz_batch,
    cell_id_from_face_ij,
    s2_cell_center_lonlat,
    s2_cell_from_lonlat,
    s2_cell_from_xyz,
    s2_level,
    s2_parent,
    s2_to_face_ij,
)


def test_lookup_tables_are_inverse_bijections():
    # every (pos, orient) entry round-trips through the ij table and back
    for b in range(1024):
        fwd = int(LOOKUP_POS[b])
        ij, orig = b >> 2, b & 3
        back = int(LOOKUP_IJ[(fwd & ~3) + orig])
        assert back >> 2 == ij and (back & 3) == (fwd & 3)
    # each orientation's position map is a permutation of the 256 sub-cells
    for orig in range(4):
        pos = sorted(int(LOOKUP_POS[(ij << 2) + orig]) >> 2 for ij in range(256))
        assert pos == list(range(256))


def test_cardinal_faces():
    lon = np.array([0.0, 90.0, 0.0, 180.0, -90.0, 0.0])
    lat = np.array([0.0, 0.0, 90.0, 0.0, 0.0, -90.0])
    ids = s2_cell_from_lonlat(lon, lat)
    assert list(ids >> np.uint64(61)) == [0, 1, 2, 3, 4, 5]
    assert all(s2_level(c) == MAX_LEVEL for c in ids)


def test_leaf_center_round_trip():
    rng = np.random.RandomState(7)
    lon = rng.uniform(-180.0, 180.0, 500)
    lat = rng.uniform(-89.9, 89.9, 500)
    ids = s2_cell_from_lonlat(lon, lat)
    for k in range(500):
        clon, clat = s2_cell_center_lonlat(int(ids[k]))
        dlon = abs((clon - lon[k] + 180.0) % 360.0 - 180.0) * np.cos(
            np.radians(lat[k])
        )
        # a level-30 cell is ~1 cm; centers must sit within a few cell widths
        assert dlon < 1e-6 and abs(clat - lat[k]) < 1e-6


def test_parent_containment_and_level():
    rng = np.random.RandomState(11)
    lon = rng.uniform(-180.0, 180.0, 300)
    lat = rng.uniform(-85.0, 85.0, 300)
    leaf = s2_cell_from_lonlat(lon, lat)
    for level in (0, 4, 8, 16, 29):
        par = s2_parent(leaf, level)
        assert all(s2_level(int(c)) == level for c in par[:20])
        # parent's id range [lo, hi) covers the leaf (range_min/range_max)
        k = np.uint64(61 - 2 * level)
        lo = (par >> k) << k
        hi = lo + (np.uint64(1) << k)
        assert ((leaf >= lo) & (leaf < hi)).all()
        # direct computation at that level agrees with truncation
        assert (s2_cell_from_lonlat(lon, lat, level) == par).all()


def test_hilbert_adjacency_within_face():
    # consecutive level-6 curve positions are edge-adjacent (i, j) cells
    shift = 61 - 2 * 6
    prev = None
    for pos in range(4096):
        cid = (3 << 61) | (pos << shift) | (1 << (shift - 1))
        _, i, j = s2_to_face_ij(cid)
        ij = (i >> 24, j >> 24)
        if prev is not None:
            assert abs(ij[0] - prev[0]) + abs(ij[1] - prev[1]) == 1
        prev = ij


def test_xyz_scale_invariance_matches_lonlat():
    rng = np.random.RandomState(3)
    lon = rng.uniform(-180.0, 180.0, 400)
    lat = rng.uniform(-89.0, 89.0, 400)
    phi, lam = np.radians(lat), np.radians(lon)
    x = np.cos(phi) * np.cos(lam)
    y = np.cos(phi) * np.sin(lam)
    z = np.sin(phi)
    a = s2_cell_from_lonlat(lon, lat, 14)
    b = s2_cell_from_xyz(x * 123.5, y * 123.5, z * 123.5, 14)
    assert (a == b).all()


def test_batch_fronts_and_sql_twin():
    ids = np.arange(5000, dtype=np.int64)
    batch = pa.table({"doc_id": ids})
    withdir = synth.s2_direction_batch(batch)
    out = assign_s2_xyz_batch(withdir, 12, parent_level=8)
    assert out.column("s2_id").type == pa.uint64()
    duckdb = pytest.importorskip("duckdb")
    con = duckdb.connect()
    con.register("ids_tbl", batch.to_pandas())
    sql = "WITH ids AS (SELECT doc_id FROM ids_tbl),\n" + synth.s2_cell_sql(12, 8)
    df = con.execute(sql).df().sort_values("doc_id").reset_index(drop=True)
    assert (df["s2_id"].to_numpy() == out.column("s2_id").to_numpy()).all()
    assert (
        df["s2_parent8"].to_numpy() == out.column("s2_parent8").to_numpy()
    ).all()
    # lon/lat front appends the same columns (values differ: trig geocode)
    geo = batch.append_column(
        "lon", pa.array(np.linspace(-179, 179, 5000))
    ).append_column("lat", pa.array(np.linspace(-80, 80, 5000)))
    out2 = assign_s2_batch(geo, 10, parent_level=4)
    assert {"s2_id", "s2_parent4"} <= set(out2.column_names)
    assert s2_level(int(out2.column("s2_id")[0].as_py())) == 10


def test_quadratic_st_monotone_and_bounded():
    from exactextractr_ray.stages.s2 import st_from_uv, uv_from_st

    u = np.linspace(-1.0, 1.0, 100001)
    s = st_from_uv(u)
    assert (np.diff(s) > 0).all() and s[0] == 0.0 and s[-1] == 1.0
    assert abs(float(st_from_uv(np.float64(0.0))) - 0.5) == 0.0
    # inverse round-trips to float precision
    assert np.allclose(uv_from_st(s), u, atol=1e-12)
