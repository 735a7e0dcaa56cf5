"""+proj= string front end (functions/crs.py parse_proj_string): parity
with the EPSG registry codes, Helmert +towgs84 wrapping, +datum shorthand,
geographic datum-shifted CRS, and a zonal parity run from an NAD27 vector
CRS (the reference's PROJ-string inputs, R/exact_extract.R:360-377)."""

import numpy as np
import pytest

from exactextractr_ray.functions.crs import (
    _bng,
    parse_crs,
    parse_proj_string,
)


LON = np.array([-75.3, -74.1, -73.2])
LAT = np.array([40.2, 41.7, 43.4])


@pytest.mark.parametrize("pstr,epsg", [
    ("+proj=utm +zone=18 +datum=WGS84 +units=m +no_defs", "EPSG:32618"),
    ("+proj=utm +zone=18 +south +datum=WGS84", "EPSG:32718"),
    ("+proj=utm +zone=18 +ellps=GRS80 +towgs84=0,0,0,0,0,0,0 +units=m",
     "EPSG:26918"),
    ("+proj=lcc +lat_1=49 +lat_2=44 +lat_0=46.5 +lon_0=3 +x_0=700000 "
     "+y_0=6600000 +ellps=GRS80 +towgs84=0,0,0,0,0,0,0 +units=m +no_defs",
     "EPSG:2154"),
    ("+proj=aea +lat_0=23 +lon_0=-96 +lat_1=29.5 +lat_2=45.5 +x_0=0 "
     "+y_0=0 +ellps=GRS80 +units=m", "EPSG:5070"),
    ("+proj=laea +lat_0=52 +lon_0=10 +x_0=4321000 +y_0=3210000 "
     "+ellps=GRS80 +units=m", "EPSG:3035"),
])
def test_proj_string_epsg_parity(pstr, epsg):
    a, b = parse_crs(pstr), parse_crs(epsg)
    xa, ya = a.forward(LON, LAT)
    xb, yb = b.forward(LON, LAT)
    np.testing.assert_allclose(xa, xb, atol=1e-8)
    np.testing.assert_allclose(ya, yb, atol=1e-8)
    lo, la = a.inverse(xa, ya)
    np.testing.assert_allclose(lo, LON, atol=1e-9)
    np.testing.assert_allclose(la, LAT, atol=1e-9)


def test_proj_string_mercator_and_longlat():
    assert parse_crs("+proj=longlat +datum=WGS84 +no_defs") is None
    assert parse_crs("+proj=longlat +ellps=WGS84") is None
    assert parse_crs("+proj=merc +a=6378137 +b=6378137 +units=m") \
        == "mercator"


def test_towgs84_bng_matches_epsg27700():
    s = ("+proj=tmerc +lat_0=49 +lon_0=-2 +k=0.9996012717 +x_0=400000 "
         "+y_0=-100000 +ellps=airy +towgs84=446.448,-125.157,542.060,"
         "0.1502,0.2470,0.8421,-20.4894 +units=m +no_defs")
    a, b = parse_crs(s), _bng()
    x1, y1 = a.forward(np.array([-1.5, 0.5]), np.array([52.0, 53.5]))
    x2, y2 = b.forward(np.array([-1.5, 0.5]), np.array([52.0, 53.5]))
    np.testing.assert_allclose(x1, x2, atol=1e-6)
    np.testing.assert_allclose(y1, y2, atol=1e-6)


def test_helmert_epsg_gn7_worked_example():
    """EPSG Guidance Note 7-2, position-vector 7-parameter example
    (WGS72 -> WGS84: tz=4.5 m, rz=0.554\", ds=0.219 ppm): published
    geocentric golden to centimeter level — pins the rotation sign
    convention (+towgs84 / EPSG method 9606)."""
    from exactextractr_ray.functions.crs import Helmert

    h = Helmert(0.0, 0.0, 4.5, 0.0, 0.0, 0.554, 0.219)
    X, Y, Z = h.to_wgs84(3657660.66, 255768.55, 5201382.11)
    assert abs(X - 3657660.78) < 0.02
    assert abs(Y - 255778.43) < 0.02
    assert abs(Z - 5201387.75) < 0.02


def test_towgs84_chain_osgb36_magnitude_and_closure():
    """Full WGS84 -> Helmert -> Airy TM chain for British National Grid:
    closes round-trip to < 1 mm, and the datum shift moves UK grid
    coordinates by the well-known ~100-130 m relative to projecting
    WGS84 coordinates directly onto the Airy TM (the error a user makes
    when they IGNORE the datum — the magnitude OS documents)."""
    from exactextractr_ray.functions.crs import TransverseMercator

    p = parse_crs("+proj=tmerc +lat_0=49 +lon_0=-2 +k=0.9996012717 "
                  "+x_0=400000 +y_0=-100000 +ellps=airy "
                  "+towgs84=446.448,-125.157,542.060,0.1502,0.2470,"
                  "0.8421,-20.4894 +units=m")
    bare = TransverseMercator(-2.0, 0.9996012717, 400000.0, -100000.0,
                              ellipsoid="AIRY", lat0_deg=49.0)
    lon = np.array([1 + 43 / 60 + 4.5177 / 3600])
    lat = np.array([52 + 39 / 60 + 27.2531 / 3600])
    x, y = p.forward(lon, lat)
    xb, yb = bare.forward(lon, lat)
    d = float(np.hypot(x - xb, y - yb)[0])
    assert 80.0 < d < 160.0
    lo, la = p.inverse(x, y)
    assert abs(lo[0] - lon[0]) < 2e-8 and abs(la[0] - lat[0]) < 2e-8


def test_nad27_geographic_shift():
    """+proj=longlat +datum=NAD27: a real (non-identity) transform with
    mm-level round-trip closure and a CONUS-plausible shift magnitude
    (tens of meters, mostly in longitude)."""
    p = parse_crs("+proj=longlat +datum=NAD27 +no_defs")
    assert p is not None
    lon0 = np.array([-98.0, -120.0, -80.0])
    lat0 = np.array([39.0, 45.0, 33.0])
    lon_n, lat_n = p.forward(lon0, lat0)   # WGS84 -> NAD27
    lon_b, lat_b = p.inverse(lon_n, lat_n)
    np.testing.assert_allclose(lon_b, lon0, atol=1e-7)
    np.testing.assert_allclose(lat_b, lat0, atol=1e-7)
    dx_m = np.abs(lon_n - lon0) * 111320 * np.cos(np.radians(lat0))
    assert (dx_m > 1.0).all() and (dx_m < 200.0).all()


def test_custom_ellipsoid_forms():
    a1 = parse_crs("+proj=tmerc +lon_0=9 +k=1 +a=6377397.155 "
                   "+rf=299.1528128 +units=m")
    a2 = parse_crs("+proj=tmerc +lon_0=9 +k=1 +ellps=bessel +units=m")
    x1, y1 = a1.forward(np.array([9.5]), np.array([47.0]))
    x2, y2 = a2.forward(np.array([9.5]), np.array([47.0]))
    np.testing.assert_allclose(x1, x2, atol=1e-9)
    np.testing.assert_allclose(y1, y2, atol=1e-9)


def test_proj_string_validation():
    with pytest.raises(ValueError, match="units"):
        parse_proj_string("+proj=utm +zone=18 +units=us-ft")
    with pytest.raises(ValueError, match="zone"):
        parse_proj_string("+proj=utm +zone=61")
    with pytest.raises(ValueError, match="no \\+proj"):
        parse_proj_string("+ellps=WGS84")
    with pytest.raises(ValueError, match="datum"):
        parse_proj_string("+proj=longlat +datum=unknown1")


def test_zonal_parity_from_nad27_vector_crs(ray_session):
    """Zones authored in NAD27 geographic coordinates, transformed to the
    raster's WGS84 frame via the proj-string front end, must give the
    same zonal stats as authoring them in WGS84 directly when the NAD27
    coordinates are the exact forward images (vector CRS contract,
    R/exact_extract.R:360-377)."""
    import pyarrow as pa

    from exactextractr_ray import wkbio
    from exactextractr_ray.functions.crs import transform_zone_table
    from exactextractr_ray.grid import Grid
    from exactextractr_ray.pipelines.zonal import exact_extract
    from exactextractr_ray.sources.raster import raster_from_array

    # raster in WGS84 degrees over a CONUS window
    g = Grid(-100.0, 35.0, -96.0, 39.0, 0.125, 0.125)
    rng = np.random.default_rng(21)
    arr = rng.integers(0, 100, (g.nrow, g.ncol)).astype(np.float64)
    rd = raster_from_array(arr, g, tile=16)

    rects = [(-99.5, 35.5, -97.25, 37.0), (-98.0, 36.5, -96.5, 38.75)]
    wgs_tbl = pa.table({
        "zone_id": pa.array([0, 1], pa.int64()),
        "geom_wkb": pa.array(
            [wkbio.rect_wkb(*r) for r in rects], pa.binary()
        ),
    })
    base = exact_extract(rd, wgs_tbl, ["count", "sum", "mean"]).to_pandas()

    # author the same zones in NAD27: every VERTEX is the exact forward
    # image (the datum shift varies spatially, so the NAD27 polygon is a
    # slightly non-rectangular quadrilateral)
    nad = parse_crs("+proj=longlat +datum=NAD27")
    nad_wkbs = []
    for (x0, y0, x1, y1) in rects:
        ring = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]])
        lo, la = nad.forward(ring[:, 0], ring[:, 1])
        nad_wkbs.append(wkbio.polygon_wkb(np.column_stack([lo, la])))
    nad_tbl = pa.table({
        "zone_id": pa.array([0, 1], pa.int64()),
        "geom_wkb": pa.array(nad_wkbs, pa.binary()),
    })
    with pytest.warns(UserWarning, match="transformed"):
        back = transform_zone_table(
            nad_tbl, "+proj=longlat +datum=NAD27", "EPSG:4326"
        )
    got = exact_extract(rd, back, ["count", "sum", "mean"]).to_pandas()
    # corners round-trip to ~1e-9 deg (< 1e-7 cell widths): stats match
    # to float noise; count/sum are coverage-weighted so compare closely
    np.testing.assert_allclose(got["count"], base["count"], rtol=1e-6)
    np.testing.assert_allclose(got["sum"], base["sum"], rtol=1e-6)
    np.testing.assert_allclose(got["mean"], base["mean"], rtol=1e-9)
