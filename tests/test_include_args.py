"""Transcription of the reference's include* argument conformance suite
(/root/reference/tests/testthat/test_exact_extract_include_args.R) onto the
Ray extraction pipeline: include_xy / include_cell / include_area /
include_cols on both the per-cell extraction path and the UDF apply path."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from exactextractr_ray import wkbio
from exactextractr_ray.grid import Grid
from exactextractr_ray.pipelines.zonal import (
    exact_extract_apply,
    extract_cells,
)
from exactextractr_ray.sources.raster import raster_from_array
from exactextractr_ray.sources.zones import zone_table


@pytest.fixture(scope="module")
def _ray(ray_session):
    return None


def _raster_1to100_colmajor(n=10):
    """raster(matrix(1:100, nrow=10)): column-major fill, raster row i (from
    the top) col j holds i + (j-1)*n (test_exact_extract_include_args.R:19)."""
    r = np.arange(n).reshape(n, 1)
    c = np.arange(n).reshape(1, n)
    vals = (r + 1) + c * n
    return raster_from_array(vals.astype(float), Grid(0, 0, n, n, 1, 1), tile=5)


def _square_raster(vals_flat, tile=5):
    """make_square_raster (helper_functions.R:39-47): byrow fill, 0..n extent."""
    n = int(math.isqrt(len(vals_flat)))
    arr = np.asarray(vals_flat, dtype=float).reshape(n, n)
    return raster_from_array(arr, Grid(0, 0, n, n, 1, 1), tile=tile)


def test_include_xy_cell_golden(_ray):
    # test_exact_extract_include_args.R:18-51
    rd = _raster_1to100_colmajor()
    poly = wkbio.polygon_wkb(
        [(3.5, 4.4), (7.5, 4.5), (7.5, 6.5), (3.5, 6.5), (3.5, 4.4)]
    )
    df = extract_cells(
        rd, zone_table([(1, "p", poly)]), include_xy=True, include_cell=True
    ).to_pandas()

    assert sorted(df["x"].unique()) == [3.5, 4.5, 5.5, 6.5, 7.5]
    assert sorted(df["y"].unique()) == [4.5, 5.5, 6.5]

    # cell == raster::cellFromXY: 1-based row-major from the top-left
    g = rd.grid
    row0 = np.floor((g.ymax - df["y"].to_numpy()) / g.dy)
    col0 = np.floor((df["x"].to_numpy() - g.xmin) / g.dx)
    np.testing.assert_array_equal(
        df["cell"].to_numpy(), (row0 * 10 + col0 + 1).astype(np.int64)
    )
    # value(row, col) = row+1 + col*10 for the column-major 1:100 fill
    np.testing.assert_allclose(df["value"].to_numpy(), row0 + 1 + col0 * 10)

    got = df.loc[(df["x"] == 3.5) & (df["y"] == 4.5), "cov"].iloc[0]
    assert got == pytest.approx(0.2968749999999998, rel=1e-8)


def test_positional_udf_gets_frame_with_include_xy(_ray):
    # test_exact_extract_include_args.R:47-50 — with include_xy, the
    # positional `values` argument is a 3-column frame (value, x, y)
    rd = _raster_1to100_colmajor()
    poly = wkbio.polygon_wkb(
        [(3.5, 4.4), (7.5, 4.5), (7.5, 6.5), (3.5, 6.5), (3.5, 4.4)]
    )

    def ncols(values, cov):
        return pd.DataFrame(
            {
                "ncol": [values.shape[1]],
                "names": [",".join(values.columns)],
            }
        )

    out = exact_extract_apply(
        rd, zone_table([(1, "p", poly)]), ncols, include_xy=True
    ).to_pandas()
    assert out["ncol"].iloc[0] == 3
    assert out["names"].iloc[0] == "value,x,y"


def test_stack_apply_with_include_xy(_ray):
    # test_exact_extract_include_args.R:53-70 — stack_apply + include_xy:
    # the UDF filters on cell y coordinates, one result column per layer
    rng = np.random.RandomState(123)
    n = 10
    a = rng.rand(n, n)
    b = rng.rand(n, n)
    rd = raster_from_array(
        a, Grid(0, 0, n, n, 1, 1), tile=5, layer="a", extra_layers={"b": b}
    )
    zones = zone_table(
        [
            (1, "c1", wkbio.circle_wkb(5, 4, 2, segments=120)),
            (2, "c2", wkbio.circle_wkb(3, 1, 1, segments=120)),
        ]
    )

    def wmean_above(values, frac):
        keep = values["y"] > 1
        return float(
            np.sum(values["value"][keep] * frac[keep]) / np.sum(frac[keep])
        )

    out = (
        exact_extract_apply(
            rd, zones, wmean_above, value_layer=["a", "b"],
            stack_apply=True, include_xy=True,
        )
        .to_pandas()
        .sort_values("zone_id")
    )
    assert list(out.columns) == ["zone_id", "result.a", "result.b"]

    # cross-check against a driver-side recomputation from the cell stream
    for lay, col in (("a", "result.a"), ("b", "result.b")):
        cells = extract_cells(
            rd, zones, value_layer=lay, include_xy=True
        ).to_pandas()
        for zid in (1, 2):
            z = cells[(cells["zone_id"] == zid) & (cells["y"] > 1)]
            exp = np.sum(z["value"] * z["cov"]) / np.sum(z["cov"])
            got = out.loc[out["zone_id"] == zid, col].iloc[0]
            assert got == pytest.approx(exp, rel=1e-12)


def test_include_area_projected(_ray):
    # test_exact_extract_include_args.R:90-97 — unit projected grid: area == 1
    rd = _square_raster(np.arange(1, 101))
    zones = zone_table([(1, "c", wkbio.circle_wkb(5, 5, 5, segments=120))])
    df = extract_cells(rd, zones, include_area=True).to_pandas()
    assert len(df) > 0
    assert (df["area"] == 1.0).all()


def test_include_area_geographic_within_1pct(_ray):
    # test_exact_extract_include_args.R:72-88 — spherical cell areas within
    # 1% of an INDEPENDENT approximation (midpoint-cosine cell area), the
    # same tolerance the reference allows vs raster::area
    g = Grid(-180, -65, 180, 85, 1, 1)
    rd = raster_from_array(np.ones((150, 360)), g, tile=30)
    zones = zone_table([(1, "c", wkbio.circle_wkb(0, 45, 15, segments=120))])
    df = extract_cells(
        rd, zones, include_cell=True, include_area=True, area_method="spherical"
    ).to_pandas()
    assert len(df) > 0

    R = 6378137.0
    rows = (df["cell"].to_numpy() - 1) // g.ncol
    lat_center = g.ymax - (rows + 0.5) * g.dy
    approx = (
        R * R * math.radians(1.0) * math.radians(1.0)
        * np.cos(np.radians(lat_center))
    )
    rel = np.abs(df["area"].to_numpy() - approx) / approx
    assert (rel < 0.01).all()


def test_include_cols_in_udf_values_frame(_ray):
    # test_exact_extract_include_args.R:146-175 — include_cols columns ride
    # inside the positional `values` frame; weights stay a numeric vector;
    # value/weight/x/y round-trip through the cell number
    n = 10
    v1 = 5.0 + np.arange(1, 101, dtype=float)  # 5 + make_square_raster(1:100)
    rng = np.random.RandomState(7)
    v2 = rng.rand(100)
    rd = raster_from_array(
        v1.reshape(n, n), Grid(0, 0, n, n, 1, 1), tile=5,
        extra_layers={"w": v2.reshape(n, n)},
    )
    zones = zone_table(
        [(1, "z", wkbio.circle_wkb(7.5, 5.5, 3.4, segments=120))]
    ).append_column("id", pa.array([77], pa.int64()))

    def probe(v, c, w):
        g = Grid(0, 0, n, n, 1, 1)
        cell0 = v["cell"].to_numpy() - 1
        row, col = cell0 // n, cell0 % n
        return pd.DataFrame(
            {
                "names": [",".join(v.columns)],
                "ids_ok": [bool((v["id"] == 77).all())],
                "vals_ok": [
                    bool(np.allclose(v["value"], v1[row * n + col]))
                ],
                "wts_ok": [bool(np.allclose(w, v2[row * n + col]))],
                "x_ok": [bool(np.allclose(v["x"], col + 0.5))],
                "y_ok": [bool(np.allclose(v["y"], g.ymax - (row + 0.5)))],
                "cov_numeric": [not isinstance(c, pd.DataFrame)],
            }
        )

    out = exact_extract_apply(
        rd, zones, probe, weight_layer="w",
        include_cols=["id"], include_cell=True, include_xy=True,
    ).to_pandas()
    assert out["names"].iloc[0] == "value,id,x,y,cell"
    for flag in ("ids_ok", "vals_ok", "wts_ok", "x_ok", "y_ok", "cov_numeric"):
        assert bool(out[flag].iloc[0]), flag

    # without xy/cell: frame is exactly (value, include_cols)
    def probe2(v, c, w):
        return pd.DataFrame({"names": [",".join(v.columns)]})

    out2 = exact_extract_apply(
        rd, zones, probe2, weight_layer="w", include_cols=["id"]
    ).to_pandas()
    assert out2["names"].iloc[0] == "value,id"


def test_include_cols_in_summarize_df_frame(_ray):
    # df-form: include_cols insert right after `value`
    rd = _square_raster(np.arange(1, 101))
    zones = zone_table(
        [(1, "z", wkbio.rect_wkb(2, 2, 6, 6))]
    ).append_column("size", pa.array(["large"], pa.string()))

    def probe(df):
        return pd.DataFrame({"names": [",".join(df.columns)]})

    out = exact_extract_apply(
        rd, zones, probe, summarize_df=True, include_cols=["size"]
    ).to_pandas()
    assert out["names"].iloc[0] == "value,size,coverage_fraction"


def test_nonintersecting_polygon_zero_rows(_ray):
    # test_exact_extract_include_args.R:177-201 (issue #68): a disjoint
    # polygon yields a ZERO-row frame that still carries the right columns
    rd = _square_raster(np.zeros(100))
    below = wkbio.polygon_wkb(
        [(0, -0.25), (1, -0.25), (1, 0 - 1e-9), (0, 0 - 1e-9), (0, -0.25)]
    )
    zones = zone_table([(1, "z", below)])

    # Ray's to_pandas() drops columns on zero-row datasets, so the contract
    # is asserted at the Dataset level: count 0 + the full schema present
    base = extract_cells(rd, zones)
    assert base.count() == 0
    assert base.schema().names == ["zone_id", "value", "cov"]

    for kwargs, extra in (
        ({"include_xy": True}, ["x", "y"]),
        ({"include_cell": True}, ["cell"]),
        ({"include_area": True}, ["area"]),
    ):
        ds = extract_cells(rd, zones, **kwargs)
        assert ds.count() == 0, kwargs
        assert ds.schema().names == ["zone_id", "value", "cov"] + extra, kwargs


def test_disjoint_polygon_udf_called_with_empty_frame(_ray):
    # test_exact_extract.R:433-485 — fn is CALLED with a zero-row frame for
    # a polygon that does not intersect the raster: fun=sum returns 0;
    # named count/sum/variety return 0 and mean/min/max NA (covered by the
    # NaN-row padding tests); per-cell extraction returns 0 rows
    rd = _square_raster(np.arange(1, 101))
    zones = zone_table(
        [(1, "far", wkbio.rect_wkb(500, 500, 510, 510))]
    )

    out = exact_extract_apply(
        rd, zones, lambda x, c: float(np.sum(x))
    ).to_pandas()
    assert list(out["zone_id"]) == [1]
    assert out["result"].iloc[0] == 0.0

    # mixed covered + disjoint, input order preserved
    zones2 = zone_table(
        [
            (7, "far", wkbio.rect_wkb(500, 500, 510, 510)),
            (3, "in", wkbio.rect_wkb(2, 2, 6, 6)),
        ]
    )
    out2 = exact_extract_apply(
        rd, zones2, lambda x, c: float(np.sum(x * c))
    ).to_pandas()
    assert list(out2["zone_id"]) == [7, 3]
    assert out2["result"].iloc[0] == 0.0 and out2["result"].iloc[1] > 0

    # summarize_df form sees the empty frame with reference column names
    def probe(df):
        return pd.DataFrame(
            {"names": [",".join(df.columns)], "n": [len(df)]}
        )

    out3 = exact_extract_apply(
        rd, zones, probe, summarize_df=True
    ).to_pandas()
    assert out3["names"].iloc[0] == "value,coverage_fraction"
    assert out3["n"].iloc[0] == 0


def test_stack_apply_append_cols_and_order(_ray):
    """Regression: stack_apply must honor append_cols (attribute columns
    lead) and return rows in INPUT order like the non-stack path."""
    n = 8
    a = np.arange(n * n, dtype=float).reshape(n, n)
    rd = raster_from_array(
        a, Grid(0, 0, n, n, 1, 1), tile=4, layer="a",
        extra_layers={"b": a * 2.0},
    )
    # input order [5, 2]: zone 5 first
    zones = zone_table(
        [
            (5, "south", wkbio.rect_wkb(0, 0, 8, 4)),
            (2, "north", wkbio.rect_wkb(0, 4, 8, 8)),
        ]
    )

    def wmean(values, cov):
        return float(np.sum(values * cov) / np.sum(cov))

    out = exact_extract_apply(
        rd, zones, wmean, value_layer=["a", "b"], stack_apply=True,
        append_cols=["name"],
    ).to_pandas()
    assert list(out.columns) == ["name", "zone_id", "result.a", "result.b"]
    assert list(out["zone_id"]) == [5, 2]
    assert list(out["name"]) == ["south", "north"]
    # layer b is exactly 2x layer a
    np.testing.assert_allclose(out["result.b"], 2.0 * out["result.a"])

    # single-layer stack recursion must also forward append_cols
    out1 = exact_extract_apply(
        rd, zones, wmean, value_layer=["a"], stack_apply=True,
        append_cols=["name"],
    ).to_pandas()
    assert "name" in out1.columns
    assert list(out1["zone_id"]) == [5, 2]


def test_categorical_summary_udf(_ray):
    # test_exact_extract.R:713-754 — custom function returning a per-class
    # coverage-sum frame
    rng = np.random.RandomState(456)
    classes = [1, 2, 3, 5]
    vals = np.array(classes)[rng.randint(0, 4, 100)].astype(float).reshape(10, 10)
    rd = raster_from_array(vals, Grid(0, 0, 10, 10, 1, 1), tile=5)
    zones = zone_table(
        [
            (1, "big", wkbio.circle_wkb(5, 4, 2, segments=120)),
            (2, "small", wkbio.circle_wkb(3, 1, 1, segments=120)),
        ]
    )

    def class_sums(x, c):
        return pd.DataFrame(
            {f"sum_{cls}": [float(np.sum(c[x == cls]))] for cls in classes}
        )

    res = exact_extract_apply(rd, zones, class_sums).to_pandas()
    assert list(res.columns) == ["zone_id", "sum_1", "sum_2", "sum_3", "sum_5"]

    # cross-check one value against a scalar-returning fn on one zone
    one = exact_extract_apply(
        rd,
        zone_table([(2, "small", wkbio.circle_wkb(3, 1, 1, segments=120))]),
        lambda x, c: float(np.sum(c[x == 3])),
    ).to_pandas()
    assert res.loc[res["zone_id"] == 2, "sum_3"].iloc[0] == pytest.approx(
        one["result"].iloc[0]
    )
    # total coverage partitions across classes
    total = exact_extract_apply(
        rd, zones, lambda x, c: float(np.sum(c))
    ).to_pandas()
    np.testing.assert_allclose(
        res[[f"sum_{c}" for c in classes]].sum(axis=1), total["result"]
    )
