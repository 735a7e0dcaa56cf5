"""GeoPackage vector source via the stdlib sqlite3 module (no GDAL/OGR).

The reference reads vector features through OGR
(/root/reference/src/exactextract/src/gdal_dataset_wrapper.cpp:22-76); a
GeoPackage is just SQLite with a registered geometry column whose BLOBs are
a small header (GP magic, flags, optional envelope) followed by standard
WKB — which this engine's own parser (wkbio) already reads. Good enough to
ingest the reference's real-world test asset (inst/sao_miguel/concelhos.gpkg)
without any native dependency.
"""

from __future__ import annotations

import sqlite3
import struct

import pyarrow as pa

_ENVELOPE_SIZE = {0: 0, 1: 32, 2: 48, 3: 48, 4: 64}


def _strip_gpkg_header(blob: bytes) -> bytes:
    """GPKG geometry BLOB -> the embedded standard WKB."""
    if blob[:2] != b"GP":
        raise ValueError("not a GeoPackage geometry blob")
    flags = blob[3]
    env = (flags >> 1) & 0x7
    return blob[8 + _ENVELOPE_SIZE[env] :]


def read_gpkg_zones(
    path: str,
    layer: str | None = None,
    name_col: str | None = None,
    id_col: str = "fid",
) -> pa.Table:
    """GeoPackage layer -> the engine's zones table
    (zone_id, zone_seq, name, geom_wkb), features in fid order."""
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        if layer is None:
            row = con.execute(
                "SELECT table_name, column_name FROM gpkg_geometry_columns"
            ).fetchone()
            if row is None:
                raise ValueError("no geometry layer registered in gpkg")
            layer, geom_col = row
        else:
            geom_col = con.execute(
                "SELECT column_name FROM gpkg_geometry_columns "
                "WHERE table_name = ?",
                (layer,),
            ).fetchone()[0]
        cols = [d[1] for d in con.execute(f"PRAGMA table_info('{layer}')")]
        if name_col is None:
            name_col = next(
                (c for c in cols if c.lower() in ("name", "nome", "label")),
                None,
            )
        sel_name = f", \"{name_col}\"" if name_col else ""
        rows = con.execute(
            f'SELECT "{id_col}", "{geom_col}"{sel_name} FROM "{layer}" '
            f'ORDER BY "{id_col}"'
        ).fetchall()
    finally:
        con.close()
    ids, wkbs, names = [], [], []
    for r in rows:
        ids.append(int(r[0]))
        wkbs.append(_strip_gpkg_header(r[1]))
        names.append(str(r[2]) if len(r) > 2 else str(r[0]))
    return pa.table(
        {
            "zone_id": pa.array(ids, pa.int64()),
            "zone_seq": pa.array(range(len(ids)), pa.int64()),
            "name": pa.array(names, pa.string()),
            "geom_wkb": pa.array(wkbs, pa.binary()),
        }
    )


def gpkg_srs(path: str, layer: str | None = None) -> str:
    """'EPSG:xxxx' of the layer's spatial reference."""
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        q = "SELECT srs_id FROM gpkg_geometry_columns"
        if layer:
            q += f" WHERE table_name = '{layer}'"
        srs = con.execute(q).fetchone()[0]
        org, code = con.execute(
            "SELECT organization, organization_coordsys_id "
            "FROM gpkg_spatial_ref_sys WHERE srs_id = ?",
            (srs,),
        ).fetchone()
    finally:
        con.close()
    return f"{org.upper()}:{code}"
