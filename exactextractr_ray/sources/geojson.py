"""GeoJSON (RFC 7946) vector source + sink — the most common OGR exchange
format after shapefiles.

Reference surface: the OGR vector ingestion behind
/root/reference/src/exactextract/src/gdal_dataset_wrapper.cpp:22-76 (GDAL
opens GeoJSON transparently) and the GDALWriter's format-agnostic sink
(gdal_writer.cpp:26-143). This module maps a FeatureCollection to the
engine's zones table (zone_id, zone_seq, name, geom_wkb) and back, pure
stdlib json:

* geometry types: Polygon, MultiPolygon, LineString, MultiLineString
  (the types the coverage kernel consumes); GeometryCollection is
  flattened; Point/MultiPoint are rejected with a clear error (the
  reference's zonal semantics need area or length);
* feature ids: RFC 7946 ``id`` member, else an ``id_col`` property, else
  input order; names from ``name_col`` (default "name") when present;
* CRS: RFC 7946 mandates WGS84, but the legacy 2008-spec ``crs`` member
  (``urn:ogc:def:crs:EPSG::nnnn`` / ``EPSG:nnnn``) is honored via the
  warn-and-transform contract (functions/crs.py, mirroring
  R/exact_extract.R:360-377) when ``target_crs`` is given;
* holes/winding: GeoJSON ring order (first=exterior, rest=holes) is
  trusted; winding is NOT significant in GeoJSON and the coverage kernel
  normalizes orientation itself.

Scale note: a single .geojson file is one JSON document — inherently a
driver-side parse (the format has no row-group structure). That is fine
for the ZONES side, which is the broadcast-small side of every zonal
pipeline; rasters and fact tables use the splittable sources.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

from .. import wkbio
from .zones import zone_table


def _coords_arr(c) -> np.ndarray:
    a = np.asarray(c, dtype=np.float64)
    return a[:, :2]  # drop Z like the WKB reader (wkbio.py Z handling)


def _geometry_to_wkb(geom: dict) -> bytes:
    t = geom.get("type")
    if t == "Polygon":
        rings = [_coords_arr(r) for r in geom["coordinates"]]
        return wkbio.polygon_wkb(rings[0], rings[1:])
    if t == "MultiPolygon":
        polys = []
        for poly in geom["coordinates"]:
            rings = [_coords_arr(r) for r in poly]
            polys.append((rings[0], rings[1:]))
        return wkbio.multipolygon_wkb(polys)
    if t == "LineString":
        return wkbio.linestring_wkb(_coords_arr(geom["coordinates"]))
    if t == "MultiLineString":
        # flat parts list == the engine's multi-geometry model: concatenate
        # per-part WKB under one MULTILINESTRING header
        import struct

        parts = geom["coordinates"]
        out = struct.pack("<BII", 1, 5, len(parts))  # wkbMultiLineString
        for p in parts:
            out += wkbio.linestring_wkb(_coords_arr(p))
        return out
    if t == "GeometryCollection":
        geoms = geom.get("geometries", [])
        if len(geoms) == 1:
            return _geometry_to_wkb(geoms[0])
        # flatten to MultiPolygon when all members are polygonal
        if all(g.get("type") in ("Polygon", "MultiPolygon") for g in geoms):
            polys = []
            for g in geoms:
                cc = (
                    [g["coordinates"]]
                    if g["type"] == "Polygon"
                    else g["coordinates"]
                )
                for poly in cc:
                    rings = [_coords_arr(r) for r in poly]
                    polys.append((rings[0], rings[1:]))
            return wkbio.multipolygon_wkb(polys)
        raise ValueError(
            "mixed GeometryCollection is not a zonal geometry"
        )
    raise ValueError(f"unsupported GeoJSON geometry type {t!r} for zones")


def _legacy_crs(doc: dict) -> str | None:
    crs = doc.get("crs")
    if not isinstance(crs, dict):
        return None
    name = crs.get("properties", {}).get("name", "")
    if "EPSG" in name.upper():
        code = name.rsplit(":", 1)[-1]
        if code.isdigit():
            return f"EPSG:{code}"
    return None


def read_geojson_zones(
    path: str,
    name_col: str = "name",
    id_col: str | None = None,
    target_crs: str | None = None,
) -> pa.Table:
    """GeoJSON FeatureCollection (or single Feature / bare geometry) ->
    zones table. ``target_crs`` transforms coordinates when the file
    carries a legacy ``crs`` member naming a different system."""
    with open(path, "r", encoding="utf-8") as f:
        doc = json.load(f)

    if doc.get("type") == "FeatureCollection":
        feats = doc.get("features", [])
    elif doc.get("type") == "Feature":
        feats = [doc]
    else:  # bare geometry
        feats = [{"type": "Feature", "properties": {}, "geometry": doc}]

    rows = []
    for i, feat in enumerate(feats):
        geom = feat.get("geometry")
        if geom is None:
            continue
        props = feat.get("properties") or {}
        if id_col is not None and id_col in props:
            zid = int(props[id_col])
        elif "id" in feat and str(feat["id"]).lstrip("-").isdigit():
            zid = int(feat["id"])
        else:
            zid = i
        name = str(props.get(name_col, f"zone{zid}"))
        rows.append((zid, name, _geometry_to_wkb(geom)))
    tbl = zone_table(rows)

    src_crs = _legacy_crs(doc)
    if target_crs is not None and src_crs is not None and src_crs != target_crs:
        from ..functions.crs import transform_zone_table

        tbl = transform_zone_table(tbl, src_crs, target_crs)
    return tbl


def _parts_to_geometry(parts: list[dict]) -> dict:
    polys = [p for p in parts if p["type"] == "Polygon"]
    lines = [p for p in parts if p["type"] == "LineString"]
    if polys and not lines:
        coords = [
            [r[:, :2].tolist() for r in p["rings"]] for p in polys
        ]
        if len(coords) == 1:
            return {"type": "Polygon", "coordinates": coords[0]}
        return {"type": "MultiPolygon", "coordinates": coords}
    if lines and not polys:
        coords = [p["coords"][:, :2].tolist() for p in lines]
        if len(coords) == 1:
            return {"type": "LineString", "coordinates": coords[0]}
        return {"type": "MultiLineString", "coordinates": coords}
    raise ValueError("mixed polygon/line zone cannot be serialized")


def write_geojson_zones(tbl: pa.Table, path: str) -> None:
    """Zones table -> GeoJSON FeatureCollection (round-trips through
    :func:`read_geojson_zones`, tested)."""
    ids = tbl.column("zone_id").to_pylist()
    names = (
        tbl.column("name").to_pylist()
        if "name" in tbl.column_names
        else [f"zone{z}" for z in ids]
    )
    wkbs = tbl.column("geom_wkb").to_pylist()
    feats = []
    for zid, name, wkb in zip(ids, names, wkbs):
        feats.append(
            {
                "type": "Feature",
                "id": int(zid),
                "properties": {"name": name},
                "geometry": _parts_to_geometry(wkbio.parse_wkb(wkb)),
            }
        )
    with open(path, "w", encoding="utf-8") as f:
        json.dump({"type": "FeatureCollection", "features": feats}, f)
