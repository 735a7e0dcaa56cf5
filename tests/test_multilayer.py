"""Multi-layer stack semantics, column naming conformance, area weighting,
default_value substitution, UDF apply path — mirroring the reference's
conformance tests (test_exact_extract.R:792-912 stacks/recycling, :960-1046
column names, include-area tests)."""

import math

import numpy as np
import pandas as pd
import pytest

from exactextractr_ray import synth, wkbio
from exactextractr_ray.grid import Grid
from exactextractr_ray.pipelines.zonal import (
    exact_extract,
    exact_extract_apply,
    make_colname,
    spherical_band_areas,
    value_weight_indexes,
)
from exactextractr_ray.sources.raster import raster_from_array
from exactextractr_ray.sources.zones import zone_table


@pytest.fixture(scope="module")
def _ray(ray_session):
    return None


def _two_layer_raster(n=8):
    g = Grid(0, 0, n, n, 1, 1)
    a = np.arange(n * n, dtype=float).reshape(n, n)
    return raster_from_array(
        a, g, tile=4, layer="a", extra_layers={"b": a * 2.0, "w": np.ones((n, n))}
    )


def test_value_weight_indexes_recycling():
    # .valueWeightIndexes (exact_extract_helpers.R:133-152)
    assert value_weight_indexes(2, 0) == ([0, 1], [None, None])
    assert value_weight_indexes(2, 2) == ([0, 1], [0, 1])
    assert value_weight_indexes(1, 3) == ([0, 0, 0], [0, 1, 2])
    assert value_weight_indexes(3, 1) == ([0, 1, 2], [0, 0, 0])
    with pytest.raises(ValueError):
        value_weight_indexes(2, 3)


def test_colname_rules():
    # .makeColname (exact_extract_helpers.R:95-115)
    assert make_colname("mean", "a", None, None, False, 1, 0) == "mean"
    assert make_colname("mean", "a", None, None, True, 1, 0) == "mean.a"
    assert make_colname("mean", "a", "w", None, False, 2, 1) == "mean.a"
    # weight name only for weighted stats, and only when ambiguous
    assert make_colname("weighted_mean", "a", "w", None, False, 1, 1) == "weighted_mean"
    assert (
        make_colname("weighted_mean", "a", "w", None, False, 2, 2)
        == "weighted_mean.a.w"
    )
    assert (
        make_colname("weighted_mean", "a", "w", None, True, 1, 1)
        == "weighted_mean.a.w"
    )
    # quantile: q%02d with truncation (as.integer)
    assert make_colname("quantile", "a", None, 0.25, False, 1, 0) == "q25"
    assert make_colname("quantile", "a", None, 0.125, False, 1, 0) == "q12"
    assert make_colname("frac", "a", None, 3.0, False, 1, 0) == "frac_3"


def test_stack_multilayer_columns(_ray):
    rd = _two_layer_raster()
    zones = zone_table([(0, "z", wkbio.rect_wkb(1, 1, 7, 7))])
    res = exact_extract(
        rd, zones, ["mean", "sum"], value_layer=["a", "b"]
    ).to_pandas()
    assert list(res.columns) == ["zone_id", "mean.a", "sum.a", "mean.b", "sum.b"]
    assert res["mean.b"].iloc[0] == 2 * res["mean.a"].iloc[0]
    assert res["sum.b"].iloc[0] == 2 * res["sum.a"].iloc[0]


def test_stack_weight_recycling(_ray):
    rd = _two_layer_raster()
    zones = zone_table([(0, "z", wkbio.rect_wkb(0, 0, 8, 8))])
    res = exact_extract(
        rd, zones, ["weighted_mean"], value_layer=["a", "b"], weight_layer="w"
    ).to_pandas()
    assert list(res.columns) == ["zone_id", "weighted_mean.a", "weighted_mean.b"]
    assert res["weighted_mean.b"].iloc[0] == pytest.approx(
        2 * res["weighted_mean.a"].iloc[0]
    )


def test_area_weights_cartesian_equals_unweighted(_ray):
    # constant cell area: weighted_mean == mean
    rd = _two_layer_raster()
    zones = zone_table([(0, "z", wkbio.rect_wkb(0.5, 0.5, 6.5, 7.0))])
    res = exact_extract(
        rd, zones, ["mean", "weighted_mean"], value_layer="a", weight_layer="area"
    ).to_pandas()
    assert res["weighted_mean"].iloc[0] == pytest.approx(res["mean"].iloc[0])


def test_spherical_band_areas_match_reference_formula():
    # raster_area.h:38-69: R^2 * pi/180 * |sin(ymin) - sin(ymax)| * dlon
    g = Grid(-180, -90, 180, 90, 1.0, 1.0)
    areas = spherical_band_areas(g, 0, 180)
    R = 6378137.0
    total = areas.sum() * 360  # every band x 360 columns
    assert total == pytest.approx(4 * math.pi * R * R, rel=1e-9)
    # equator band biggest
    assert areas[89] == areas.max() or areas[90] == areas.max()


def test_spherical_area_weighted_mean(_ray):
    g = Grid(0, 40, 10, 50, 1.0, 1.0)  # 10x10 degrees
    vals = np.arange(100, dtype=float).reshape(10, 10)
    rd = raster_from_array(vals, g, tile=5)
    zones = zone_table([(0, "z", wkbio.rect_wkb(0, 40, 10, 50))])
    res = exact_extract(
        rd, zones, ["weighted_mean"], weight_layer="area", area_method="spherical"
    ).to_pandas()
    areas = spherical_band_areas(g, 0, 10)
    w = np.broadcast_to(areas[:, None], (10, 10))
    expect = float(np.sum(vals * w) / np.sum(w))
    assert res["weighted_mean"].iloc[0] == pytest.approx(expect, rel=1e-12)


def test_coverage_area_scales_count(_ray):
    g = Grid(0, 0, 4, 4, 0.5, 0.5)  # cell area 0.25
    vals = np.ones((8, 8))
    rd = raster_from_array(vals, g, tile=4)
    zones = zone_table([(0, "z", wkbio.rect_wkb(0, 0, 4, 4))])
    res = exact_extract(rd, zones, ["count"], coverage_area=True).to_pandas()
    # count with coverage_area = total covered AREA = 16 world units
    assert res["count"].iloc[0] == pytest.approx(16.0)


def test_default_value_substitution(_ray):
    # test_exact_extract.R:1048-1086
    g = Grid(0, 0, 4, 4, 1, 1)
    vals = np.ones((4, 4))
    vals[1, 1] = np.nan
    rd = raster_from_array(vals, g, tile=4)
    zones = zone_table([(0, "z", wkbio.rect_wkb(0, 0, 4, 4))])
    base = exact_extract(rd, zones, ["sum", "count"]).to_pandas()
    assert base["sum"].iloc[0] == 15.0 and base["count"].iloc[0] == 15.0
    subst = exact_extract(rd, zones, ["sum", "count"], default_value=5.0).to_pandas()
    assert subst["sum"].iloc[0] == 20.0 and subst["count"].iloc[0] == 16.0


def test_apply_udf(_ray):
    rd = _two_layer_raster()
    zones = zone_table(
        [
            (0, "z0", wkbio.rect_wkb(0.5, 0.5, 3.5, 3.5)),
            (1, "z1", wkbio.rect_wkb(4, 4, 8, 8)),
        ]
    )

    # the R-default POSITIONAL convention: fn(values, coverage_fractions)
    def covered_mean(values, cov) -> pd.DataFrame:
        return pd.DataFrame(
            {"my_mean": [float(np.sum(values * cov) / np.sum(cov))]}
        )

    out = exact_extract_apply(rd, zones, covered_mean, value_layer="a").to_pandas()
    ref = exact_extract(rd, zones, ["mean"], value_layer="a").to_pandas()
    merged = out.merge(ref, on="zone_id")
    assert np.allclose(merged["my_mean"], merged["mean"])

    # summarize_df=True: fn(df) with the reference's column names
    def covered_mean_df(df: pd.DataFrame) -> pd.DataFrame:
        assert list(df.columns) == ["value", "coverage_fraction"]
        return pd.DataFrame(
            {
                "my_mean": [
                    float(
                        np.sum(df["value"] * df["coverage_fraction"])
                        / np.sum(df["coverage_fraction"])
                    )
                ]
            }
        )

    out2 = exact_extract_apply(
        rd, zones, covered_mean_df, value_layer="a", summarize_df=True
    ).to_pandas()
    assert np.allclose(out2.merge(ref, on="zone_id")["my_mean"], merged["mean"])


def test_apply_udf_arity_and_weights(_ray):
    """Transcribed reference arity contract (exact_extract.R:413-430) and
    the weighted positional convention fn(values, cov, weights)."""
    rd = _two_layer_raster()
    zones = zone_table([(0, "z", wkbio.rect_wkb(0, 0, 8, 8))])

    # one-arg fn without summarize_df -> the reference's error
    with pytest.raises(ValueError, match="values, coverage_fractions"):
        exact_extract_apply(rd, zones, lambda df: df, value_layer="a")
    # two-arg fn with weights -> the reference's 3-arg error
    with pytest.raises(ValueError, match="weights"):
        exact_extract_apply(
            rd, zones, lambda v, c: None, value_layer="a", weight_layer="b"
        )
    # zero-arg fn with summarize_df -> df-form error
    with pytest.raises(ValueError, match="function\\(df"):
        exact_extract_apply(
            rd, zones, lambda: None, value_layer="a", summarize_df=True
        )
    # extra args WITH defaults don't count toward the arity (R's formals rule)
    def wmean(values, cov, weights, scale=1.0):
        return pd.DataFrame(
            {"wm": [float(np.sum(values * cov * weights) / np.sum(cov * weights)) * scale]}
        )

    out = exact_extract_apply(
        rd, zones, wmean, value_layer="a", weight_layer="b"
    ).to_pandas()
    ref = exact_extract(
        rd, zones, ["weighted_mean"], value_layer="a", weight_layer="b"
    ).to_pandas()
    assert np.allclose(out["wm"], ref["weighted_mean"])

    # **fn_kwargs pass-through (the reference's `...`)
    out2 = exact_extract_apply(
        rd, zones, wmean, value_layer="a", weight_layer="b",
        fn_kwargs={"scale": 2.0},
    ).to_pandas()
    assert np.allclose(out2["wm"], 2.0 * ref["weighted_mean"])


def test_apply_udf_multirow_rbind(_ray):
    """A UDF returning a multi-row frame r-binds across zones with zone_id
    repeated (the reference's data.frame rbind semantics)."""
    rd = _two_layer_raster()
    zones = zone_table(
        [
            (0, "z0", wkbio.rect_wkb(0, 0, 4, 4)),
            (1, "z1", wkbio.rect_wkb(4, 4, 8, 8)),
        ]
    )

    def top2(values, cov):
        idx = np.argsort(-values.to_numpy())[:2]
        return pd.DataFrame({"v": values.to_numpy()[idx], "rank": [1, 2]})

    out = exact_extract_apply(rd, zones, top2, value_layer="a").to_pandas()
    out = out.sort_values(["zone_id", "rank"]).reset_index(drop=True)
    assert list(out["zone_id"]) == [0, 0, 1, 1]
    assert (out.groupby("zone_id")["v"].first()
            >= out.groupby("zone_id")["v"].last()).all()


def test_include_area_column(_ray):
    from exactextractr_ray.pipelines.zonal import extract_cells

    g = Grid(0, 0, 4, 4, 0.5, 0.5)
    rd = raster_from_array(np.ones((8, 8)), g, tile=8)
    zones = zone_table([(0, "z", wkbio.rect_wkb(0, 0, 4, 4))])
    df = extract_cells(rd, zones, include_area=True).to_pandas()
    assert (df["area"] == 0.25).all()


def test_colname_fun_hook(_ray):
    rd = _two_layer_raster()
    zones = zone_table([(0, "z", wkbio.rect_wkb(0, 0, 8, 8))])

    def namer(**kw):
        return f"{kw['fun_name']}_of_{kw['values']}"

    res = exact_extract(
        rd, zones, ["mean"], value_layer=["a", "b"], colname_fun=namer
    ).to_pandas()
    assert list(res.columns) == ["zone_id", "mean_of_a", "mean_of_b"]


def test_multilayer_frac_union(_ray):
    g = Grid(0, 0, 4, 4, 1, 1)
    a = np.repeat([1.0, 2.0], 8).reshape(4, 4)
    b = np.repeat([2.0, 3.0], 8).reshape(4, 4)
    rd = raster_from_array(a, g, tile=4, layer="a", extra_layers={"b": b})
    zones = zone_table([(0, "z", wkbio.rect_wkb(0, 0, 4, 4))])
    res = exact_extract(rd, zones, ["frac"], value_layer=["a", "b"]).to_pandas()
    # union of observed values {1,2,3} -> three frac columns per layer
    assert list(res.columns) == [
        "zone_id",
        "frac_1.a", "frac_2.a", "frac_3.a",
        "frac_1.b", "frac_2.b", "frac_3.b",
    ]
    assert res["frac_1.a"].iloc[0] == 0.5 and res["frac_3.a"].iloc[0] == 0.0
    assert res["frac_1.b"].iloc[0] == 0.0 and res["frac_3.b"].iloc[0] == 0.5


def test_crs_transform_roundtrip():
    from exactextractr_ray.functions.crs import (
        lonlat_to_mercator,
        mercator_to_lonlat,
        transform_zone_table,
    )

    lon = np.array([-122.4, 0.0, 151.2])
    lat = np.array([37.77, 0.0, -33.87])
    x, y = lonlat_to_mercator(lon, lat)
    lon2, lat2 = mercator_to_lonlat(x, y)
    np.testing.assert_allclose(lon2, lon, rtol=1e-12)
    np.testing.assert_allclose(lat2, lat, rtol=1e-10)
    # known value: lon 180 -> pi*R
    x180, _ = lonlat_to_mercator(np.array([180.0]), np.array([0.0]))
    assert x180[0] == pytest.approx(np.pi * 6378137.0)

    zones = zone_table([(0, "z", wkbio.rect_wkb(-1.0, -1.0, 1.0, 1.0))])
    with pytest.warns(UserWarning, match="transformed"):
        tz = transform_zone_table(zones, "EPSG:4326", "EPSG:3857")
    from exactextractr_ray.wkbio import parse_wkb, parts_envelope

    env = parts_envelope(parse_wkb(tz.column("geom_wkb")[0].as_py()))
    assert env[0] == pytest.approx(-111319.49, rel=1e-4)
    with pytest.raises(ValueError, match="unsupported CRS"):
        transform_zone_table(zones, "EPSG:4326", "EPSG:99999")


def test_utm_roundtrip_nanometer():
    """TM forward∘inverse closes to < 1e-9 m across a UTM zone's usable span
    (lon0 ± 3.5°, lat -80..84), the Krüger-series accuracy claim."""
    from exactextractr_ray.functions.crs import TransverseMercator

    tm = TransverseMercator(lon0_deg=-75.0)  # UTM 18N
    rng = np.random.default_rng(3)
    lon = -75.0 + rng.uniform(-3.5, 3.5, 4000)
    lat = rng.uniform(-80.0, 84.0, 4000)
    x, y = tm.forward(lon, lat)
    lon2, lat2 = tm.inverse(x, y)
    # angular closure converted to meters (1 deg ~ 111320 m); the float64
    # representation floor at ~1e7 m coordinates is eps*1e7 ≈ 2e-9 m per op,
    # so sub-10-nanometer closure IS the double-precision optimum
    err_m = np.hypot((lon2 - lon) * np.cos(np.radians(lat)), lat2 - lat) * 111320.0
    assert float(err_m.max()) < 1e-8

    # UTM anchors: a point ON the central meridian maps to x = FE exactly,
    # and the equator to y = 0
    x0, y0 = tm.forward(np.array([-75.0]), np.array([0.0]))
    assert x0[0] == pytest.approx(500000.0, abs=1e-9)
    assert y0[0] == pytest.approx(0.0, abs=1e-9)


def test_utm_meridian_arc_independent():
    """Independent cross-check of the series constants: along the central
    meridian, northing = k0 * (meridian arc length), where the arc length is
    computed here by dense Simpson integration of the meridian radius —
    no shared code with the Krüger series."""
    from exactextractr_ray.functions.crs import TransverseMercator

    tm = TransverseMercator(lon0_deg=-75.0)
    a, f = 6378137.0, 1.0 / 298.257223563
    e2 = f * (2 - f)
    for lat_deg in (12.0, 40.5, 66.0):
        phi = np.linspace(0.0, np.radians(lat_deg), 200001)
        integrand = a * (1 - e2) / (1 - e2 * np.sin(phi) ** 2) ** 1.5
        # Simpson's rule
        h = phi[1] - phi[0]
        arc = h / 3 * (
            integrand[0] + integrand[-1]
            + 4 * integrand[1:-1:2].sum() + 2 * integrand[2:-1:2].sum()
        )
        _, y = tm.forward(np.array([-75.0]), np.array([lat_deg]))
        assert y[0] == pytest.approx(0.9996 * arc, abs=1e-4)


def test_lcc_lambert93():
    """LCC 2SP (EPSG:2154): origin anchor, round-trip, and unit scale at the
    standard parallels (k = 1 there by construction — checked numerically
    with finite differences, independent of the closed form)."""
    from exactextractr_ray.functions.crs import parse_crs

    lcc = parse_crs("EPSG:2154")
    # the natural origin maps to the false origin exactly
    x, y = lcc.forward(np.array([3.0]), np.array([46.5]))
    assert x[0] == pytest.approx(700000.0, abs=1e-9)
    assert y[0] == pytest.approx(6600000.0, abs=1e-9)

    rng = np.random.default_rng(4)
    lon = rng.uniform(-5.0, 10.0, 2000)
    lat = rng.uniform(41.0, 51.5, 2000)
    x, y = lcc.forward(lon, lat)
    lon2, lat2 = lcc.inverse(x, y)
    err_m = np.hypot((lon2 - lon) * np.cos(np.radians(lat)), lat2 - lat) * 111320.0
    assert float(err_m.max()) < 1e-8

    # scale along a parallel == 1 at the standard parallels 44N / 49N
    a, f = 6378137.0, 1.0 / 298.257222101
    e2 = f * (2 - f)
    for sp in (44.0, 49.0):
        d = 1e-6
        (x1, _), (x2, _) = (
            lcc.forward(np.array([v]), np.array([sp])) for v in (3.0, 3.0 + d)
        )
        proj_dist = abs(x2[0] - x1[0])
        nu = a / np.sqrt(1 - e2 * np.sin(np.radians(sp)) ** 2)
        true_dist = np.radians(d) * nu * np.cos(np.radians(sp))
        assert proj_dist / true_dist == pytest.approx(1.0, abs=1e-7)


def test_zonal_with_utm_zones_matches_4326(_ray):
    """The verdict's done-criterion: a zonal query whose zones arrive in
    EPSG:32618 must match the same query with native-4326 zones. The raster
    lives in UTM-18's lon range so the transform is well-conditioned."""
    from exactextractr_ray.functions.crs import TransverseMercator, transform_zone_table
    from exactextractr_ray.grid import Grid
    from exactextractr_ray.pipelines.zonal import exact_extract
    from exactextractr_ray.sources.raster import raster_from_array

    # geographic raster near (-75, 40): 32 x 32 cells of 0.01 deg
    g = Grid(-75.2, 40.0, -75.2 + 0.32, 40.32, 0.01, 0.01)
    rng = np.random.default_rng(11)
    vals = rng.integers(0, 100, (32, 32)).astype(np.float64)
    rd = raster_from_array(vals, g, tile=16)

    zones4326 = zone_table(
        [
            (0, "a", wkbio.rect_wkb(-75.15, 40.05, -75.02, 40.17)),
            (1, "b", wkbio.rect_wkb(-75.1, 40.2, -74.95, 40.3)),
        ]
    )
    base = exact_extract(rd, zones4326, ["count", "sum", "mean"]).to_pandas()

    # represent the same zones in UTM 18N; densify edges so the polygon
    # SHAPE (not just corners) survives the non-affine transform
    tm = TransverseMercator(lon0_deg=-75.0)

    def densify_rect(x0, y0, x1, y1, k=64):
        xs = np.linspace(x0, x1, k)
        ys = np.linspace(y0, y1, k)
        ring = np.concatenate(
            [
                np.column_stack([xs, np.full(k, y0)]),
                np.column_stack([np.full(k, x1), ys]),
                np.column_stack([xs[::-1], np.full(k, y1)]),
                np.column_stack([np.full(k, x0), ys[::-1]]),
            ]
        )
        return ring

    rows = []
    for zid, (x0, y0, x1, y1) in enumerate(
        [(-75.15, 40.05, -75.02, 40.17), (-75.1, 40.2, -74.95, 40.3)]
    ):
        ring = densify_rect(x0, y0, x1, y1)
        ux, uy = tm.forward(ring[:, 0], ring[:, 1])
        utm_ring = np.column_stack([ux, uy])
        rows.append((zid, f"z{zid}", wkbio.polygon_wkb(utm_ring, [])))
    zones_utm = zone_table(rows)
    with pytest.warns(UserWarning, match="transformed"):
        zones_back = transform_zone_table(zones_utm, "EPSG:32618", "EPSG:4326")
    got = exact_extract(rd, zones_back, ["count", "sum", "mean"]).to_pandas()

    for c in ("count", "sum", "mean"):
        np.testing.assert_allclose(got[c], base[c], rtol=1e-9)


def test_stack_apply_udf(_ray):
    rd = _two_layer_raster()
    zones = zone_table([(0, "z", wkbio.rect_wkb(0, 0, 8, 8))])

    def total(values, cov):
        return pd.DataFrame({"t": [float((values * cov).sum())]})

    out = exact_extract_apply(
        rd, zones, total, value_layer=["a", "b"], stack_apply=True
    ).to_pandas()
    assert list(out.columns) == ["zone_id", "t.a", "t.b"]
    assert out["t.b"].iloc[0] == pytest.approx(2 * out["t.a"].iloc[0])


def test_append_cols_carries_attributes(_ray):
    """append_cols (the reference's named-summary attribute pass-through,
    R/exact_extract.R:219-224) joins zone attribute columns onto the result."""
    rd = _two_layer_raster()
    zones = zone_table(
        [
            (0, "alpha", wkbio.rect_wkb(0, 0, 4, 4)),
            (1, "beta", wkbio.rect_wkb(4, 4, 8, 8)),
        ]
    )
    res = exact_extract(
        rd, zones, ["mean"], value_layer="a", append_cols=["name"]
    ).to_pandas()
    assert list(res["name"]) == ["alpha", "beta"]
    assert "mean" in res.columns


def test_apply_udf_append_cols_multirow(_ray):
    """Transcribed: test_exact_extract.R:1169-1240 — append_cols with UDFs
    returning multi-row frames, length-k vectors, and zero-row frames."""
    rd = _two_layer_raster()
    zones = zone_table(
        [
            (0, "a", wkbio.rect_wkb(0, 0, 4, 4)),
            (1, "b", wkbio.rect_wkb(4, 4, 8, 8)),
        ]
    )

    # multi-row data frame
    out = exact_extract_apply(
        rd, zones,
        lambda v, c: pd.DataFrame({"x": [1, 2, 3], "x2": [4, 5, 6]}),
        value_layer="a", append_cols=["name"],
    ).to_pandas().sort_values(["name", "x"]).reset_index(drop=True)
    assert list(out.columns)[0] == "name"
    assert list(out["name"]) == ["a"] * 3 + ["b"] * 3
    assert list(out["x"]) == [1, 2, 3, 1, 2, 3]

    # length-k vector -> 'result' rows
    out2 = exact_extract_apply(
        rd, zones, lambda v, c: np.array([1, 2, 3]),
        value_layer="a", append_cols=["name"],
    ).to_pandas().sort_values(["name", "result"]).reset_index(drop=True)
    assert list(out2["result"]) == [1, 2, 3, 1, 2, 3]

    # zero-row frame -> zone contributes no rows (names preserved)
    out3 = exact_extract_apply(
        rd, zones,
        lambda v, c: pd.DataFrame({"x": pd.Series([], dtype=np.float64)}),
        value_layer="a", append_cols=["name"],
    ).to_pandas()
    assert len(out3) == 0


def test_albers_snyder_worked_example():
    """Snyder (1987) Appendix A, Albers ellipsoidal example: Clarke 1866,
    lat1=29.5, lat2=45.5, lat0=23, lon0=-96; the point (35N, 75W) maps to
    x=1,885,472.7 y=1,535,925.0 — an independent published golden."""
    from exactextractr_ray.functions.crs import AlbersEqualArea

    p = AlbersEqualArea(29.5, 45.5, 23.0, -96.0, ellipsoid="CLRK66")
    x, y = p.forward(np.array([-75.0]), np.array([35.0]))
    assert x[0] == pytest.approx(1885472.7, abs=0.05)
    assert y[0] == pytest.approx(1535925.0, abs=0.05)


def test_albers_epsg5070_anchors_and_roundtrip():
    from exactextractr_ray.functions.crs import parse_crs

    a = parse_crs("EPSG:5070")
    # natural origin (-96, 23) -> (0, 0) with zero false offsets
    x0, y0 = a.forward(np.array([-96.0]), np.array([23.0]))
    assert x0[0] == pytest.approx(0.0, abs=1e-9)
    assert y0[0] == pytest.approx(0.0, abs=1e-9)
    # round-trip over CONUS closes below 1e-7 m
    rng = np.random.default_rng(7)
    lon = rng.uniform(-125.0, -66.0, 4000)
    lat = rng.uniform(24.0, 50.0, 4000)
    x, y = a.forward(lon, lat)
    lon2, lat2 = a.inverse(x, y)
    err_m = np.hypot((lon2 - lon) * np.cos(np.radians(lat)), lat2 - lat) * 111320.0
    assert float(err_m.max()) < 1e-7
    # California Albers false northing anchor: (-120, 0) -> (0, -4,000,000)
    ca = parse_crs("EPSG:3310")
    xc, yc = ca.forward(np.array([-120.0]), np.array([0.0]))
    assert xc[0] == pytest.approx(0.0, abs=1e-9)
    assert yc[0] == pytest.approx(-4000000.0, abs=1e-9)


def test_albers_equal_area_property():
    """The defining invariant, checked independently of the closed form:
    the Jacobian determinant of (lon,lat)->(x,y) equals the ellipsoidal
    area element M*N*cos(phi) everywhere (area distortion == 1)."""
    from exactextractr_ray.functions.crs import parse_crs

    a_proj = parse_crs("EPSG:5070")
    a, f = 6378137.0, 1.0 / 298.257222101
    e2 = f * (2 - f)
    d = 1e-7
    for lon, lat in [(-96.0, 23.0), (-120.0, 44.0), (-70.0, 30.0), (-96.0, 49.0)]:
        x00, y00 = a_proj.forward(np.array([lon]), np.array([lat]))
        x10, y10 = a_proj.forward(np.array([lon + d]), np.array([lat]))
        x01, y01 = a_proj.forward(np.array([lon]), np.array([lat + d]))
        jac = abs(
            (x10[0] - x00[0]) * (y01[0] - y00[0])
            - (x01[0] - x00[0]) * (y10[0] - y00[0])
        ) / np.radians(d) ** 2
        s2 = np.sin(np.radians(lat)) ** 2
        M = a * (1 - e2) / (1 - e2 * s2) ** 1.5
        N = a / np.sqrt(1 - e2 * s2)
        assert jac / (M * N * np.cos(np.radians(lat))) == pytest.approx(
            1.0, abs=1e-5
        )


def test_epsg_table_codes_parse():
    from exactextractr_ray.functions.crs import (
        AlbersEqualArea, LambertConformalConic, TransverseMercator, parse_crs,
    )

    assert parse_crs("EPSG:4269") is None  # NAD83 geographic -> hub alias
    assert parse_crs("EPSG:4258") is None
    assert isinstance(parse_crs("EPSG:3577"), AlbersEqualArea)
    assert isinstance(parse_crs("ESRI:102003"), AlbersEqualArea)
    assert isinstance(parse_crs("EPSG:3347"), LambertConformalConic)
    assert isinstance(parse_crs("EPSG:26918"), TransverseMercator)
    assert isinstance(parse_crs("aea:29.5,45.5,23,-96,0,0"), AlbersEqualArea)
    with pytest.raises(ValueError, match="unsupported"):
        parse_crs("EPSG:99999")
    # NAD83 UTM 18N differs from WGS84 UTM 18N only in the (tiny) ellipsoid
    w = parse_crs("EPSG:32618")
    n = parse_crs("EPSG:26918")
    xw, yw = w.forward(np.array([-75.5]), np.array([40.0]))
    xn, yn = n.forward(np.array([-75.5]), np.array([40.0]))
    assert abs(xw[0] - xn[0]) < 0.01 and abs(yw[0] - yn[0]) < 0.01
    assert (xw[0], yw[0]) != (xn[0], yn[0])


def test_zonal_with_albers_zones_matches_4326(_ray):
    """Verdict item 4 done-criterion: a zonal query whose zones arrive in
    EPSG:5070 must match the native-4326 run (same pattern as the
    EPSG:32618 parity test above)."""
    from exactextractr_ray.functions.crs import parse_crs, transform_zone_table
    from exactextractr_ray.pipelines.zonal import exact_extract
    from exactextractr_ray.sources.raster import raster_from_array

    g = Grid(-96.4, 38.0, -96.4 + 0.32, 38.32, 0.01, 0.01)
    rng = np.random.default_rng(12)
    vals = rng.integers(0, 100, (32, 32)).astype(np.float64)
    rd = raster_from_array(vals, g, tile=16)

    rects = [(-96.35, 38.05, -96.22, 38.17), (-96.3, 38.2, -96.15, 38.3)]
    zones4326 = zone_table(
        [(i, f"z{i}", wkbio.rect_wkb(*r)) for i, r in enumerate(rects)]
    )
    base = exact_extract(rd, zones4326, ["count", "sum", "mean"]).to_pandas()

    aea = parse_crs("EPSG:5070")
    rows = []
    for zid, (x0, y0, x1, y1) in enumerate(rects):
        k = 64
        xs = np.linspace(x0, x1, k)
        ys = np.linspace(y0, y1, k)
        ring = np.concatenate(
            [
                np.column_stack([xs, np.full(k, y0)]),
                np.column_stack([np.full(k, x1), ys]),
                np.column_stack([xs[::-1], np.full(k, y1)]),
                np.column_stack([np.full(k, x0), ys[::-1]]),
            ]
        )
        px, py = aea.forward(ring[:, 0], ring[:, 1])
        rows.append((zid, f"z{zid}", wkbio.polygon_wkb(np.column_stack([px, py]), [])))
    zones_aea = zone_table(rows)
    with pytest.warns(UserWarning, match="transformed"):
        zones_back = transform_zone_table(zones_aea, "EPSG:5070", "EPSG:4326")
    got = exact_extract(rd, zones_back, ["count", "sum", "mean"]).to_pandas()
    for c in ("count", "sum", "mean"):
        np.testing.assert_allclose(got[c], base[c], rtol=1e-9)


def test_wkt_crs_parser():
    """parse_crs_wkt: AUTHORITY routing, parameter reconstruction (ESRI
    Albers text without EPSG tags), 1SP/2SP handling, GEOGCS hub, and raw
    WKT accepted by parse_crs — the shapefile-.prj surface the reference
    gets from OGR/PROJ (R/exact_extract.R:360-377)."""
    import re

    from exactextractr_ray.functions.crs import parse_crs, parse_crs_wkt

    wkt5070 = (
        'PROJCS["NAD_1983_Contiguous_USA_Albers",GEOGCS['
        '"GCS_North_American_1983",DATUM["D_North_American_1983",SPHEROID['
        '"GRS_1980",6378137.0,298.257222101]],PRIMEM["Greenwich",0.0],UNIT['
        '"Degree",0.0174532925199433]],PROJECTION["Albers"],PARAMETER['
        '"False_Easting",0.0],PARAMETER["False_Northing",0.0],PARAMETER['
        '"Central_Meridian",-96.0],PARAMETER["Standard_Parallel_1",29.5],'
        'PARAMETER["Standard_Parallel_2",45.5],PARAMETER['
        '"Latitude_Of_Origin",23.0],UNIT["Meter",1.0]]'
    )
    lon = np.array([-100.0, -80.0])
    lat = np.array([30.0, 45.0])
    np.testing.assert_allclose(
        parse_crs_wkt(wkt5070).forward(lon, lat),
        parse_crs("EPSG:5070").forward(lon, lat),
        rtol=1e-12,
    )

    wkt326 = (
        'PROJCS["WGS 84 / UTM zone 18N",GEOGCS["WGS 84",DATUM["WGS_1984",'
        'SPHEROID["WGS 84",6378137,298.257223563,AUTHORITY["EPSG","7030"]],'
        'AUTHORITY["EPSG","6326"]],PRIMEM["Greenwich",0],UNIT["degree",'
        '0.0174532925199433],AUTHORITY["EPSG","4326"]],PROJECTION['
        '"Transverse_Mercator"],PARAMETER["latitude_of_origin",0],'
        'PARAMETER["central_meridian",-75],PARAMETER["scale_factor",0.9996],'
        'PARAMETER["false_easting",500000],PARAMETER["false_northing",0],'
        'UNIT["metre",1],AUTHORITY["EPSG","32618"]]'
    )
    ref = parse_crs("EPSG:32618").forward(lon, lat)
    np.testing.assert_allclose(parse_crs_wkt(wkt326).forward(lon, lat), ref,
                               rtol=1e-12)
    # strip authorities -> pure parameter reconstruction, same projection
    noauth = re.sub(r",AUTHORITY\[[^\]]*\]", "", wkt326)
    np.testing.assert_allclose(parse_crs_wkt(noauth).forward(lon, lat), ref,
                               rtol=1e-12)

    assert parse_crs_wkt(
        'GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",SPHEROID["WGS_1984",'
        "6378137.0,298.257223563]]]"
    ) is None
    assert parse_crs(wkt5070) is not None  # raw WKT routed by parse_crs
    with pytest.raises(ValueError, match="PROJECTION"):
        parse_crs_wkt('PROJCS["broken",UNIT["Meter",1.0]]')


def test_crs_from_prj_sidecar(tmp_path):
    from exactextractr_ray.functions.crs import AlbersEqualArea, crs_from_prj

    p = tmp_path / "zones.prj"
    p.write_text(
        'PROJCS["aea",GEOGCS["GCS_North_American_1983",DATUM['
        '"D_North_American_1983",SPHEROID["GRS_1980",6378137.0,'
        '298.257222101]],PRIMEM["Greenwich",0.0],UNIT["Degree",'
        '0.0174532925199433]],PROJECTION["Albers"],PARAMETER['
        '"Central_Meridian",-96.0],PARAMETER["Standard_Parallel_1",29.5],'
        'PARAMETER["Standard_Parallel_2",45.5],PARAMETER['
        '"Latitude_Of_Origin",23.0],UNIT["Meter",1.0]]'
    )
    assert isinstance(crs_from_prj(str(p)), AlbersEqualArea)


def test_read_shp_zones_with_prj(tmp_path):
    """Shapefile zone ingestion: ring grouping per the ESRI spec, DBF
    attributes, and .prj-driven auto-transform to EPSG:4326 — the OGR
    vector-source analog (gdal_dataset_wrapper.cpp:22-76)."""
    from exactextractr_ray.functions.crs import parse_crs
    from exactextractr_ray.sources.sinks import write_shp
    from exactextractr_ray.sources.zones import read_shp_zones

    df = pd.DataFrame({"zone_id": [0, 1], "name": ["alpha", "beta"]})
    zwkb = [wkbio.rect_wkb(0, 0, 4, 4), wkbio.rect_wkb(4, 4, 8, 8)]
    shp = str(tmp_path / "z.shp")
    write_shp(df, shp, zwkb)
    tbl = read_shp_zones(shp, id_col="zone_id")
    assert tbl.column("zone_id").to_pylist() == [0, 1]
    assert tbl.column("name").to_pylist() == ["alpha", "beta"]
    for g, w in zip(tbl.column("geom_wkb").to_pylist(), zwkb):
        r1 = wkbio.parse_wkb(g)[0]["rings"][0]
        r2 = wkbio.parse_wkb(w)[0]["rings"][0]
        assert (
            r1[:, 0].min() == r2[:, 0].min()
            and r1[:, 1].max() == r2[:, 1].max()
        )

    # UTM-projected shapefile + .prj: zones come back in lon/lat
    tm = parse_crs("EPSG:32618")
    rects_ll = [(-75.15, 40.05, -75.02, 40.17), (-75.1, 40.2, -74.95, 40.3)]
    geo = []
    for (x0, y0, x1, y1) in rects_ll:
        xs = np.linspace(x0, x1, 32)
        ys = np.linspace(y0, y1, 32)
        ring = np.concatenate(
            [
                np.column_stack([xs, np.full(32, y0)]),
                np.column_stack([np.full(32, x1), ys]),
                np.column_stack([xs[::-1], np.full(32, y1)]),
                np.column_stack([np.full(32, x0), ys[::-1]]),
            ]
        )
        ux, uy = tm.forward(ring[:, 0], ring[:, 1])
        geo.append(wkbio.polygon_wkb(np.column_stack([ux, uy]), []))
    shp2 = str(tmp_path / "zu.shp")
    write_shp(df, shp2, geo)
    (tmp_path / "zu.prj").write_text(
        'PROJCS["WGS 84 / UTM zone 18N",GEOGCS["WGS 84",DATUM["WGS_1984",'
        'SPHEROID["WGS 84",6378137,298.257223563]],PRIMEM["Greenwich",0],'
        'UNIT["degree",0.0174532925199433]],PROJECTION['
        '"Transverse_Mercator"],PARAMETER["latitude_of_origin",0],'
        'PARAMETER["central_meridian",-75],PARAMETER["scale_factor",0.9996],'
        'PARAMETER["false_easting",500000],PARAMETER["false_northing",0],'
        'UNIT["metre",1]]'
    )
    with pytest.warns(UserWarning, match="transformed"):
        t2 = read_shp_zones(shp2, id_col="zone_id")
    for g, (x0, y0, x1, y1) in zip(
        t2.column("geom_wkb").to_pylist(), rects_ll
    ):
        r = wkbio.parse_wkb(g)[0]["rings"][0]
        assert abs(r[:, 0].min() - x0) < 1e-8
        assert abs(r[:, 1].max() - y1) < 1e-8


def test_bng_os_worked_example():
    """OS 'A guide to coordinate systems in Great Britain' worked example:
    OSGB36 52°39'27.2531"N 1°43'4.5177"E -> E 651409.903 N 313177.270 —
    validates the TM latitude-of-origin northing (lat0=49N) on Airy 1830
    to sub-millimeter against the published golden."""
    from exactextractr_ray.functions.crs import TransverseMercator

    tm = TransverseMercator(
        -2.0, 0.9996012717, 400000.0, -100000.0, ellipsoid="AIRY",
        lat0_deg=49.0,
    )
    lat = 52 + 39 / 60 + 27.2531 / 3600
    lon = 1 + 43 / 60 + 4.5177 / 3600
    x, y = tm.forward(np.array([lon]), np.array([lat]))
    assert x[0] == pytest.approx(651409.903, abs=2e-3)
    assert y[0] == pytest.approx(313177.270, abs=2e-3)


def test_datum_shifted_crs():
    """EPSG:27700 (OSGB36 Helmert) and ED50 UTM: round-trips close to the
    documented ~1 mm 2-D-chain floor, London lands in the right BNG
    neighborhood, the ED50 offset has the real-world ~100-250 m size, and
    a TOWGS84-bearing WKT reproduces the EPSG-table projection."""
    from exactextractr_ray.functions.crs import parse_crs, parse_crs_wkt

    bng = parse_crs("EPSG:27700")
    rng = np.random.default_rng(8)
    lo = rng.uniform(-6.0, 1.5, 2000)
    la = rng.uniform(50.0, 58.5, 2000)
    xx, yy = bng.forward(lo, la)
    lo2, la2 = bng.inverse(xx, yy)
    err = np.hypot((lo2 - lo) * np.cos(np.radians(la)), la2 - la) * 111320
    assert float(err.max()) < 5e-3  # documented h=0 snap floor, not fp noise

    xl, yl = bng.forward(np.array([-0.1276]), np.array([51.5074]))
    assert 528000 < xl[0] < 532000 and 178000 < yl[0] < 182500

    ed = parse_crs("EPSG:23031")
    w = parse_crs("EPSG:32631")
    pe = np.array(ed.forward(np.array([3.0]), np.array([45.0])))
    pw = np.array(w.forward(np.array([3.0]), np.array([45.0])))
    assert 50 < float(np.hypot(*(pw - pe))) < 400

    wkt = (
        'PROJCS["OSGB 1936 / British National Grid",GEOGCS["OSGB 1936",'
        'DATUM["OSGB_1936",SPHEROID["Airy 1830",6377563.396,299.3249646],'
        "TOWGS84[446.448,-125.157,542.06,0.1502,0.247,0.8421,-20.4894]],"
        'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],'
        'PROJECTION["Transverse_Mercator"],PARAMETER["latitude_of_origin",'
        '49],PARAMETER["central_meridian",-2],PARAMETER["scale_factor",'
        '0.9996012717],PARAMETER["false_easting",400000],PARAMETER['
        '"false_northing",-100000],UNIT["metre",1]]'
    )
    bw = parse_crs_wkt(wkt)
    xv, yv = bw.forward(np.array([-0.1276]), np.array([51.5074]))
    assert abs(xv[0] - xl[0]) < 1e-6 and abs(yv[0] - yl[0]) < 1e-6

    # ETRS89 UTM zones resolve (no shift needed)
    assert parse_crs("EPSG:25832") is not None


def test_laea_snyder_worked_example():
    """Snyder (1987) Appendix A, ellipsoidal oblique LAEA example:
    Clarke 1866, origin (40N, 100W), point (30N, 110W) ->
    x=-965,932.1 y=-1,056,814.9 — independent published golden."""
    from exactextractr_ray.functions.crs import LambertAzimuthalEqualArea

    p = LambertAzimuthalEqualArea(40.0, -100.0, ellipsoid="CLRK66")
    x, y = p.forward(np.array([-110.0]), np.array([30.0]))
    assert x[0] == pytest.approx(-965932.1, abs=0.05)
    assert y[0] == pytest.approx(-1056814.9, abs=0.05)


def test_laea_epsg3035():
    """EPSG:3035 (Europe LAEA): origin anchor, sub-1e-7 m round-trip over
    the European extent, and the equal-area Jacobian invariant."""
    from exactextractr_ray.functions.crs import parse_crs

    e = parse_crs("EPSG:3035")
    x0, y0 = e.forward(np.array([10.0]), np.array([52.0]))
    assert x0[0] == pytest.approx(4321000.0, abs=1e-9)
    assert y0[0] == pytest.approx(3210000.0, abs=1e-9)

    rng = np.random.default_rng(9)
    lo = rng.uniform(-10.0, 30.0, 3000)
    la = rng.uniform(35.0, 70.0, 3000)
    xx, yy = e.forward(lo, la)
    lo2, la2 = e.inverse(xx, yy)
    err = np.hypot((lo2 - lo) * np.cos(np.radians(la)), la2 - la) * 111320
    assert float(err.max()) < 1e-7

    a, f = 6378137.0, 1.0 / 298.257222101
    e2 = f * (2 - f)
    d = 1e-7
    for lon, lat in [(10.0, 52.0), (25.0, 60.0), (-5.0, 40.0)]:
        x00, y00 = e.forward(np.array([lon]), np.array([lat]))
        x10, y10 = e.forward(np.array([lon + d]), np.array([lat]))
        x01, y01 = e.forward(np.array([lon]), np.array([lat + d]))
        jac = abs(
            (x10[0] - x00[0]) * (y01[0] - y00[0])
            - (x01[0] - x00[0]) * (y10[0] - y00[0])
        ) / np.radians(d) ** 2
        s2 = np.sin(np.radians(lat)) ** 2
        M = a * (1 - e2) / (1 - e2 * s2) ** 1.5
        N = a / np.sqrt(1 - e2 * s2)
        assert jac / (M * N * np.cos(np.radians(lat))) == pytest.approx(
            1.0, abs=1e-5
        )

    # WKT reconstruction matches the table entry
    from exactextractr_ray.functions.crs import parse_crs_wkt

    wkt = (
        'PROJCS["ETRS89-extended / LAEA Europe",GEOGCS["ETRS89",DATUM['
        '"European_Terrestrial_Reference_System_1989",SPHEROID["GRS 1980",'
        "6378137,298.257222101]],PRIMEM[\"Greenwich\",0],UNIT[\"degree\","
        "0.0174532925199433]],PROJECTION[\"Lambert_Azimuthal_Equal_Area\"],"
        'PARAMETER["latitude_of_center",52],PARAMETER['
        '"longitude_of_center",10],PARAMETER["false_easting",4321000],'
        'PARAMETER["false_northing",3210000],UNIT["metre",1]]'
    )
    w = parse_crs_wkt(wkt)
    pt = (np.array([15.0]), np.array([55.0]))
    np.testing.assert_allclose(w.forward(*pt), e.forward(*pt), rtol=1e-12)


def test_polar_stereographic():
    """Snyder (1987) Appendix A polar stereographic ellipsoid example
    (International 1924, lat_ts=-71, lon0=-100, point 75S 150E ->
    -1,540,033.6 / -560,526.4), EPSG:3413/3031 round-trips in both
    hemispheres, scale 1 at the standard parallel, variant-A (pole origin
    + k0) support, and GDAL-style WKT reconstruction."""
    from exactextractr_ray.functions.crs import (
        PolarStereographic, parse_crs, parse_crs_wkt,
    )

    p = PolarStereographic(-71.0, -100.0, ellipsoid="INTL")
    x, y = p.forward(np.array([150.0]), np.array([-75.0]))
    assert x[0] == pytest.approx(-1540033.6, abs=0.1)
    assert y[0] == pytest.approx(-560526.4, abs=0.1)

    rng = np.random.default_rng(4)
    for code, la_rng in [("EPSG:3413", (55.0, 89.9)),
                         ("EPSG:3031", (-89.9, -55.0))]:
        q = parse_crs(code)
        lo = rng.uniform(-180, 180, 2000)
        la = rng.uniform(*la_rng, 2000)
        xx, yy = q.forward(lo, la)
        lo2, la2 = q.inverse(xx, yy)
        dl = (lo2 - lo + 180) % 360 - 180
        err = np.hypot(dl * np.cos(np.radians(la)), la2 - la) * 111320
        assert float(err.max()) < 1e-6

    # k == 1 at the 70N standard parallel (finite difference, independent)
    n = parse_crs("EPSG:3413")
    a, f = 6378137.0, 1 / 298.257223563
    e2 = f * (2 - f)
    d = 1e-7
    (x1, y1) = n.forward(np.array([0.0]), np.array([70.0]))
    (x2, y2) = n.forward(np.array([d]), np.array([70.0]))
    proj = np.hypot(x2[0] - x1[0], y2[0] - y1[0])
    N = a / np.sqrt(1 - e2 * np.sin(np.radians(70)) ** 2)
    assert proj / (np.radians(d) * N * np.cos(np.radians(70))) == (
        pytest.approx(1.0, abs=1e-6)
    )

    # variant A (origin at the pole, explicit k0) round-trips
    va = PolarStereographic(90.0, -45.0, k0=0.994)
    lo = np.array([30.0, -120.0])
    la = np.array([75.0, 80.0])
    xx, yy = va.forward(lo, la)
    lo2, la2 = va.inverse(xx, yy)
    np.testing.assert_allclose(lo2, lo)
    np.testing.assert_allclose(la2, la, atol=1e-12)

    wkt = (
        'PROJCS["NSIDC Sea Ice Polar Stereographic North",GEOGCS["WGS 84",'
        'DATUM["WGS_1984",SPHEROID["WGS 84",6378137,298.257223563]],'
        'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],'
        'PROJECTION["Polar_Stereographic"],PARAMETER["latitude_of_origin",'
        '70],PARAMETER["central_meridian",-45],PARAMETER["false_easting",0],'
        'PARAMETER["false_northing",0],UNIT["metre",1]]'
    )
    w = parse_crs_wkt(wkt)
    pt = (np.array([10.0]), np.array([72.0]))
    np.testing.assert_allclose(w.forward(*pt), n.forward(*pt), rtol=1e-12)


def test_sinusoidal_and_equirectangular():
    """MODIS sinusoidal (SR-ORG:6842 sphere R=6371007.181): known MODIS
    tile-grid anchors — global width = 2*pi*R, (0,0) -> origin, equal-area
    Jacobian; Plate Carree linearity; WKT reconstruction; round-trips."""
    from exactextractr_ray.functions.crs import (
        Equirectangular, Sinusoidal, parse_crs, parse_crs_wkt,
    )

    s = parse_crs("EPSG:6842")
    assert isinstance(s, Sinusoidal)
    R = 6371007.181
    # equator: x spans the full 2*pi*R circumference
    x, y = s.forward(np.array([180.0]), np.array([0.0]))
    assert x[0] == pytest.approx(np.pi * R, rel=1e-12)
    assert y[0] == pytest.approx(0.0, abs=1e-9)
    x, y = s.forward(np.array([0.0]), np.array([40.0]))
    assert x[0] == pytest.approx(0.0, abs=1e-9)
    assert y[0] == pytest.approx(np.radians(40.0) * R, rel=1e-12)

    rng = np.random.default_rng(12)
    lo = rng.uniform(-179.0, 179.0, 3000)
    la = rng.uniform(-85.0, 85.0, 3000)
    xx, yy = s.forward(lo, la)
    lo2, la2 = s.inverse(xx, yy)
    err = np.hypot((lo2 - lo) * np.cos(np.radians(la)), la2 - la) * 111320
    assert float(err.max()) < 1e-7

    # equal-area on the sphere: Jacobian == R^2 cos(phi)
    d = 1e-7
    for lon, lat in [(10.0, 20.0), (-120.0, 55.0)]:
        x00, y00 = s.forward(np.array([lon]), np.array([lat]))
        x10, y10 = s.forward(np.array([lon + d]), np.array([lat]))
        x01, y01 = s.forward(np.array([lon]), np.array([lat + d]))
        jac = abs(
            (x10[0] - x00[0]) * (y01[0] - y00[0])
            - (x01[0] - x00[0]) * (y10[0] - y00[0])
        ) / np.radians(d) ** 2
        assert jac == pytest.approx(R * R * np.cos(np.radians(lat)), rel=1e-4)

    e = parse_crs("EPSG:32662")
    assert isinstance(e, Equirectangular)
    x, y = e.forward(np.array([90.0]), np.array([45.0]))
    assert x[0] == pytest.approx(np.pi / 2 * 6378137.0, rel=1e-12)
    assert y[0] == pytest.approx(np.pi / 4 * 6378137.0, rel=1e-12)

    # MODIS-style WKT reconstruction (sphere radius from SPHEROID a, 1/f=0)
    wkt = (
        'PROJCS["MODIS Sinusoidal",GEOGCS["Unknown datum based upon the '
        'custom spheroid",DATUM["Not_specified",SPHEROID["Custom spheroid",'
        '6371007.181,0]],PRIMEM["Greenwich",0],UNIT["degree",'
        '0.0174532925199433]],PROJECTION["Sinusoidal"],PARAMETER['
        '"longitude_of_center",0],PARAMETER["false_easting",0],PARAMETER['
        '"false_northing",0],UNIT["metre",1]]'
    )
    w = parse_crs_wkt(wkt)
    pt = (np.array([-110.0]), np.array([35.0]))
    np.testing.assert_allclose(w.forward(*pt), s.forward(*pt), rtol=1e-12)


def test_zonal_with_polar_stereo_zones_matches_4326(_ray):
    """Integration parity for the new projection family: zones arriving in
    EPSG:3413 (NSIDC polar stereographic) must reproduce the native-4326
    zonal result (same pattern as the UTM/Albers tests)."""
    from exactextractr_ray.functions.crs import parse_crs, transform_zone_table
    from exactextractr_ray.pipelines.zonal import exact_extract
    from exactextractr_ray.sources.raster import raster_from_array

    g = Grid(-46.0, 70.0, -46.0 + 0.32, 70.32, 0.01, 0.01)
    rng = np.random.default_rng(13)
    vals = rng.integers(0, 100, (32, 32)).astype(np.float64)
    rd = raster_from_array(vals, g, tile=16)

    rects = [(-45.95, 70.05, -45.82, 70.17), (-45.9, 70.2, -45.75, 70.3)]
    zones4326 = zone_table(
        [(i, f"z{i}", wkbio.rect_wkb(*r)) for i, r in enumerate(rects)]
    )
    base = exact_extract(rd, zones4326, ["count", "sum", "mean"]).to_pandas()

    ps = parse_crs("EPSG:3413")
    rows = []
    for zid, (x0, y0, x1, y1) in enumerate(rects):
        k = 64
        xs = np.linspace(x0, x1, k)
        ys = np.linspace(y0, y1, k)
        ring = np.concatenate(
            [
                np.column_stack([xs, np.full(k, y0)]),
                np.column_stack([np.full(k, x1), ys]),
                np.column_stack([xs[::-1], np.full(k, y1)]),
                np.column_stack([np.full(k, x0), ys[::-1]]),
            ]
        )
        px, py = ps.forward(ring[:, 0], ring[:, 1])
        rows.append(
            (zid, f"z{zid}", wkbio.polygon_wkb(np.column_stack([px, py]), []))
        )
    zones_ps = zone_table(rows)
    with pytest.warns(UserWarning, match="transformed"):
        zones_back = transform_zone_table(zones_ps, "EPSG:3413", "EPSG:4326")
    got = exact_extract(rd, zones_back, ["count", "sum", "mean"]).to_pandas()
    for c in ("count", "sum", "mean"):
        np.testing.assert_allclose(got[c], base[c], rtol=1e-9)
