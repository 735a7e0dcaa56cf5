"""Vector CRS transforms (no pyproj in this environment — pure numpy math).

The reference transforms POLYGONS to the raster's CRS on the fly with a
warning (/root/reference/R/exact_extract.R:360-377); rasters are never
reprojected. Same contract here: ``transform_zone_table`` rewrites zone WKB
between the two CRSs this engine supports in closed form:

* EPSG:4326  — lon/lat degrees on the WGS84 sphere (as used everywhere else
  in this engine);
* EPSG:3857 — spherical Web Mercator meters (R = 6378137).

Anything else raises — explicitly out of scope without a projection library.
"""

from __future__ import annotations

import math
import warnings

import numpy as np
import pyarrow as pa

from .. import wkbio

R_MERC = 6378137.0
SUPPORTED = {"EPSG:4326", "EPSG:3857"}


def lonlat_to_mercator(lon: np.ndarray, lat: np.ndarray):
    x = np.asarray(lon, dtype=np.float64) * (math.pi / 180.0) * R_MERC
    phi = np.clip(np.asarray(lat, dtype=np.float64), -89.9999, 89.9999) * (
        math.pi / 180.0
    )
    y = R_MERC * np.log(np.tan(math.pi / 4.0 + phi / 2.0))
    return x, y


def mercator_to_lonlat(x: np.ndarray, y: np.ndarray):
    lon = np.asarray(x, dtype=np.float64) / R_MERC * (180.0 / math.pi)
    lat = (
        2.0 * np.arctan(np.exp(np.asarray(y, dtype=np.float64) / R_MERC))
        - math.pi / 2.0
    ) * (180.0 / math.pi)
    return lon, lat


def _transform_coords(coords: np.ndarray, src: str, dst: str) -> np.ndarray:
    if src == dst:
        return coords
    if src == "EPSG:4326" and dst == "EPSG:3857":
        x, y = lonlat_to_mercator(coords[:, 0], coords[:, 1])
    elif src == "EPSG:3857" and dst == "EPSG:4326":
        x, y = mercator_to_lonlat(coords[:, 0], coords[:, 1])
    else:
        raise ValueError(f"unsupported CRS pair {src} -> {dst}; supported: {SUPPORTED}")
    return np.column_stack([x, y])


def transform_zone_table(zones: pa.Table, src_crs: str, dst_crs: str) -> pa.Table:
    """Rewrite zone geometries from src_crs to dst_crs (warns, like the
    reference's on-the-fly st_transform)."""
    if src_crs == dst_crs:
        return zones
    warnings.warn(
        f"Polygons transformed from {src_crs} to {dst_crs} to match the raster",
        stacklevel=2,
    )
    out_wkb = []
    for wkb in zones.column("geom_wkb").to_pylist():
        parts = wkbio.parse_wkb(wkb)
        polys = []
        lines = None
        for p in parts:
            if p["type"] == "Polygon":
                shell = _transform_coords(p["rings"][0], src_crs, dst_crs)
                holes = [
                    _transform_coords(r, src_crs, dst_crs) for r in p["rings"][1:]
                ]
                polys.append((shell, holes))
            elif p["type"] == "LineString":
                lines = _transform_coords(p["coords"], src_crs, dst_crs)
        if lines is not None and not polys:
            out_wkb.append(wkbio.linestring_wkb(lines))
        elif len(polys) == 1:
            out_wkb.append(wkbio.polygon_wkb(polys[0][0], polys[0][1]))
        else:
            out_wkb.append(wkbio.multipolygon_wkb(polys))
    idx = zones.column_names.index("geom_wkb")
    return zones.set_column(idx, "geom_wkb", pa.array(out_wkb, pa.binary()))
