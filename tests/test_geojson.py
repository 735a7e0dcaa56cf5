"""GeoJSON vector source/sink: round-trips, geometry types, legacy CRS,
and zonal parity with directly-built zone tables."""

import json

import numpy as np
import pytest

from exactextractr_ray import wkbio
from exactextractr_ray.sources.geojson import (
    read_geojson_zones,
    write_geojson_zones,
)
from exactextractr_ray.sources.zones import parse_zone_table, zone_table


def _fc(features):
    return {"type": "FeatureCollection", "features": features}


def _feat(geom, props=None, fid=None):
    f = {"type": "Feature", "properties": props or {}, "geometry": geom}
    if fid is not None:
        f["id"] = fid
    return f


def test_polygon_with_hole_roundtrip(tmp_path):
    shell = [[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]]
    hole = [[3, 3], [5, 3], [5, 5], [3, 5], [3, 3]]
    p = str(tmp_path / "z.geojson")
    with open(p, "w") as f:
        json.dump(
            _fc(
                [
                    _feat(
                        {"type": "Polygon", "coordinates": [shell, hole]},
                        {"name": "holey"},
                        fid=7,
                    )
                ]
            ),
            f,
        )
    tbl = read_geojson_zones(p)
    assert tbl.column("zone_id").to_pylist() == [7]
    assert tbl.column("name").to_pylist() == ["holey"]
    parts = wkbio.parse_wkb(tbl.column("geom_wkb")[0].as_py())
    assert parts[0]["type"] == "Polygon" and len(parts[0]["rings"]) == 2

    # write -> read round trip preserves the geometry (ring orientation may
    # be normalized by the WKB parser; compare point sets + areas)
    p2 = str(tmp_path / "z2.geojson")
    write_geojson_zones(tbl, p2)
    tbl2 = read_geojson_zones(p2)
    parts2 = wkbio.parse_wkb(tbl2.column("geom_wkb")[0].as_py())
    for r1, r2 in zip(parts[0]["rings"], parts2[0]["rings"]):
        assert {tuple(p) for p in r1} == {tuple(p) for p in r2}
        assert abs(wkbio.ring_area_signed(r1)) == abs(
            wkbio.ring_area_signed(r2)
        )
    assert tbl2.column("zone_id").to_pylist() == [7]


def test_multipolygon_and_lines_roundtrip(tmp_path):
    mp = {
        "type": "MultiPolygon",
        "coordinates": [
            [[[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]]],
            [[[6, 6], [9, 6], [9, 9], [6, 9], [6, 6]]],
        ],
    }
    ls = {"type": "LineString", "coordinates": [[0, 0], [3, 4], [6, 4]]}
    mls = {
        "type": "MultiLineString",
        "coordinates": [[[0, 0], [1, 1]], [[2, 2], [3, 3]]],
    }
    p = str(tmp_path / "m.geojson")
    with open(p, "w") as f:
        json.dump(_fc([_feat(mp), _feat(ls), _feat(mls)]), f)
    tbl = read_geojson_zones(p)
    assert tbl.num_rows == 3
    k0 = wkbio.parse_wkb(tbl.column("geom_wkb")[0].as_py())
    k1 = wkbio.parse_wkb(tbl.column("geom_wkb")[1].as_py())
    k2 = wkbio.parse_wkb(tbl.column("geom_wkb")[2].as_py())
    assert [q["type"] for q in k0] == ["Polygon", "Polygon"]
    assert [q["type"] for q in k1] == ["LineString"]
    assert [q["type"] for q in k2] == ["LineString", "LineString"]
    p2 = str(tmp_path / "m2.geojson")
    write_geojson_zones(tbl, p2)
    tbl2 = read_geojson_zones(p2)
    for i in range(3):
        assert (
            tbl2.column("geom_wkb")[i].as_py()
            == tbl.column("geom_wkb")[i].as_py()
        )


def test_points_rejected(tmp_path):
    p = str(tmp_path / "pt.geojson")
    with open(p, "w") as f:
        json.dump(_fc([_feat({"type": "Point", "coordinates": [1, 2]})]), f)
    with pytest.raises(ValueError, match="unsupported"):
        read_geojson_zones(p)


def test_id_col_and_default_ids(tmp_path):
    sq = {"type": "Polygon",
          "coordinates": [[[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]]]}
    p = str(tmp_path / "i.geojson")
    with open(p, "w") as f:
        json.dump(
            _fc([_feat(sq, {"fid": 42, "name": "a"}),
                 _feat(sq, {"fid": 43, "name": "b"})]),
            f,
        )
    tbl = read_geojson_zones(p, id_col="fid")
    assert tbl.column("zone_id").to_pylist() == [42, 43]
    tbl2 = read_geojson_zones(p)  # no id member, no id_col -> input order
    assert tbl2.column("zone_id").to_pylist() == [0, 1]


def test_legacy_crs_transform(tmp_path):
    # a webmercator square around (0, 0) transforms to lon/lat degrees
    sq = {
        "type": "Polygon",
        "coordinates": [
            [[-111319.49079327358, -111325.14286638486],
             [111319.49079327358, -111325.14286638486],
             [111319.49079327358, 111325.14286638486],
             [-111319.49079327358, 111325.14286638486],
             [-111319.49079327358, -111325.14286638486]]
        ],
    }
    doc = _fc([_feat(sq)])
    doc["crs"] = {
        "type": "name",
        "properties": {"name": "urn:ogc:def:crs:EPSG::3857"},
    }
    p = str(tmp_path / "c.geojson")
    with open(p, "w") as f:
        json.dump(doc, f)
    tbl = read_geojson_zones(p, target_crs="EPSG:4326")
    ring = wkbio.parse_wkb(tbl.column("geom_wkb")[0].as_py())[0]["rings"][0]
    np.testing.assert_allclose(
        sorted(set(np.round(ring[:, 0], 6))), [-1.0, 1.0]
    )
    np.testing.assert_allclose(
        sorted(set(np.round(ring[:, 1], 6))), [-1.0, 1.0]
    )


def test_zonal_parity_geojson_vs_direct(ray_session, tmp_path):
    """exact_extract over GeoJSON-sourced zones == directly-built zones."""
    from exactextractr_ray.pipelines.zonal import exact_extract
    from exactextractr_ray.sources.raster import raster_from_array
    from exactextractr_ray.grid import Grid

    g = Grid(0, 0, 16, 16, 1.0, 1.0)
    rng = np.random.default_rng(5)
    arr = rng.integers(0, 100, size=(16, 16)).astype(np.float64)
    zones = zone_table(
        [
            (1, "a", wkbio.rect_wkb(0.5, 0.5, 7.25, 9.75)),
            (2, "b", wkbio.rect_wkb(6.5, 2.5, 15.5, 14.5)),
        ]
    )
    p = str(tmp_path / "zz.geojson")
    write_geojson_zones(zones, p)
    zones2 = read_geojson_zones(p)
    r1 = exact_extract(
        raster_from_array(arr, g, tile=8), zones, ["count", "sum", "mean"]
    ).to_pandas()
    r2 = exact_extract(
        raster_from_array(arr, g, tile=8), zones2, ["count", "sum", "mean"]
    ).to_pandas()
    for c in ("count", "sum", "mean"):
        np.testing.assert_array_equal(r1[c].to_numpy(), r2[c].to_numpy())
