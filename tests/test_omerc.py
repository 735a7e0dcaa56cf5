"""Hotine Oblique Mercator (EPSG 9815 variant B) — functions/crs.py
HotineObliqueMercator: EPSG Guidance Note 7-2 worked example golden
(Timbalai 1948 / RSO Borneo), Swiss somerc grids, conformality and
round-trip invariants.
"""

import math

import numpy as np
import pytest

from exactextractr_ray.functions.crs import HotineObliqueMercator, parse_crs


def _borneo():
    return HotineObliqueMercator(
        lat0_deg=4.0, lonc_deg=115.0,
        azimuth_deg=53 + 18 / 60 + 56.9537 / 3600,
        gamma_deg=53 + 7 / 60 + 48.3685 / 3600,
        k0=0.99984, false_easting=590476.87, false_northing=442857.65,
        ellipsoid="EVRST67",
    )


def test_epsg_gn7_worked_example():
    """EPSG Guidance Note 7 part 2, method 9815 example: Timbalai 1948 /
    RSO Borneo (m). phi=5°23'14.1129\"N, lam=115°48'19.8196\"E ->
    E=679245.73, N=596562.78."""
    p = _borneo()
    lon = 115 + 48 / 60 + 19.8196 / 3600
    lat = 5 + 23 / 60 + 14.1129 / 3600
    x, y = p.forward(np.array([lon]), np.array([lat]))
    assert abs(x[0] - 679245.73) < 0.02
    assert abs(y[0] - 596562.78) < 0.02
    lo, la = p.inverse(x, y)
    assert abs(lo[0] - lon) < 1e-9 and abs(la[0] - lat) < 1e-9


def test_variant_b_center_is_false_origin():
    p = _borneo()
    x, y = p.forward(np.array([115.0]), np.array([4.0]))
    assert abs(x[0] - 590476.87) < 1e-6
    assert abs(y[0] - 442857.65) < 1e-6


def test_conformality_jacobian():
    """HOM is conformal: the numerical Jacobian at any point must be a
    scaled rotation (equal singular values; det > 0)."""
    p = _borneo()
    for lon, lat in [(115.8, 5.4), (114.0, 3.0), (117.5, 6.5)]:
        h = 1e-7
        x0, y0 = p.forward(np.array([lon]), np.array([lat]))
        xl, yl = p.forward(np.array([lon + h]), np.array([lat]))
        xp, yp = p.forward(np.array([lon]), np.array([lat + h]))
        J = np.array(
            [[(xl[0] - x0[0]) / h, (xp[0] - x0[0]) / h],
             [(yl[0] - y0[0]) / h, (yp[0] - y0[0]) / h]]
        )
        # ellipsoidal metric: a degree of longitude spans nu*cos(lat),
        # a degree of latitude spans rho (meridional radius)
        a, inv_f = 6377298.556, 300.8017
        e2 = (2 - 1 / inv_f) / inv_f
        s = math.sin(math.radians(lat))
        nu = a / math.sqrt(1 - e2 * s * s)
        rho = a * (1 - e2) / (1 - e2 * s * s) ** 1.5
        J[:, 0] /= nu * math.cos(math.radians(lat))
        J[:, 1] /= rho
        sv = np.linalg.svd(J, compute_uv=False)
        assert sv[0] / sv[1] == pytest.approx(1.0, abs=1e-5)
        assert np.linalg.det(J) > 0


def test_swiss_lv95_roundtrip_and_anchor():
    """EPSG:2056 (CH1903+/LV95, somerc = HOM with azimuth 90): WGS84
    round-trip to ~mm; Zurich lands in the publicly-known LV95 km square
    (2683, 1247) +- 2 km (Helmert ~2 m method accuracy documented)."""
    p = parse_crs("EPSG:2056")
    lon = np.array([8.5417, 7.4474, 6.1432])   # Zurich, Bern, Geneva
    lat = np.array([47.3769, 46.9480, 46.2044])
    x, y = p.forward(lon, lat)
    lo, la = p.inverse(x, y)
    assert np.abs(lo - lon).max() < 1e-7 and np.abs(la - lat).max() < 1e-7
    assert abs(x[0] - 2683000) < 2000 and abs(y[0] - 1247000) < 2000
    assert abs(x[1] - 2600000) < 2000 and abs(y[1] - 1200000) < 2000
    assert abs(x[2] - 2500000) < 3000 and abs(y[2] - 1117500) < 3000


def test_swiss_lv03_offset_from_lv95():
    """EPSG:21781 (LV03) differs from LV95 by the (2000000, 1000000)
    false-origin shift modulo the CH1903 vs CH1903+ datum gap (<~2 m)."""
    p95 = parse_crs("EPSG:2056")
    p03 = parse_crs("EPSG:21781")
    lon, lat = np.array([8.5417]), np.array([47.3769])
    x95, y95 = p95.forward(lon, lat)
    x03, y03 = p03.forward(lon, lat)
    assert abs((x95[0] - x03[0]) - 2000000) < 2.0
    assert abs((y95[0] - y03[0]) - 1000000) < 2.0


def test_epsg_29873_and_custom_string():
    p = parse_crs("EPSG:29873")
    lon, lat = np.array([115.5]), np.array([5.0])
    x, y = p.forward(lon, lat)
    lo, la = p.inverse(x, y)
    assert abs(lo[0] - lon[0]) < 1e-7 and abs(la[0] - lat[0]) < 1e-7
    # custom omerc string (no datum shift): matches the raw projection
    raw = parse_crs(
        "omerc:4.0,115.0,"
        f"{53 + 18 / 60 + 56.9537 / 3600},{53 + 7 / 60 + 48.3685 / 3600},"
        "0.99984,590476.87,442857.65,EVRST67"
    )
    x2, y2 = raw.forward(lon, lat)
    b = _borneo()
    x3, y3 = b.forward(lon, lat)
    assert abs(x2[0] - x3[0]) < 1e-9 and abs(y2[0] - y3[0]) < 1e-9


def test_wkt_swiss_and_hotine():
    """A CH1903+/LV95 WKT1 .prj body (no AUTHORITY) reconstructs via the
    parameter path and matches the EPSG:2056 table entry."""
    from exactextractr_ray.functions.crs import parse_crs_wkt

    wkt = (
        'PROJCS["CH1903+ / LV95",GEOGCS["CH1903+",DATUM["CH1903+",'
        'SPHEROID["Bessel 1841",6377397.155,299.1528128],'
        "TOWGS84[674.374,15.056,405.346,0,0,0,0]],"
        'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],'
        'PROJECTION["Hotine_Oblique_Mercator_Azimuth_Center"],'
        'PARAMETER["latitude_of_center",46.9524055555556],'
        'PARAMETER["longitude_of_center",7.43958333333333],'
        'PARAMETER["azimuth",90],PARAMETER["rectified_grid_angle",90],'
        'PARAMETER["scale_factor",1],'
        'PARAMETER["false_easting",2600000],'
        'PARAMETER["false_northing",1200000],UNIT["metre",1]]'
    )
    got = parse_crs_wkt(wkt)
    want = parse_crs("EPSG:2056")
    lon, lat = np.array([8.5417, 6.6323]), np.array([47.3769, 46.5197])
    xg, yg = got.forward(lon, lat)
    xw, yw = want.forward(lon, lat)
    assert np.abs(xg - xw).max() < 1e-6
    assert np.abs(yg - yw).max() < 1e-6


def test_roundtrip_property_random_points():
    rng = np.random.default_rng(3)
    p = _borneo()
    lon = 115.0 + rng.uniform(-3, 3, 50)
    lat = 4.0 + rng.uniform(-3, 3, 50)
    lo, la = p.inverse(*p.forward(lon, lat))
    assert np.abs(lo - lon).max() < 1e-9
    assert np.abs(la - lat).max() < 1e-9
