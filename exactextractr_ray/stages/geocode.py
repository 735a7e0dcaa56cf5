"""Deterministic geocoding + spatial-key assignment stages.

Pages/documents are geocoded by a pure function of their key (BASELINE.json:
tile assignments must be reproducible at any parallelism), then assigned a
flat lat/lon grid cell id — the H3-cell stand-in for this environment (no h3
library; see FIXTURES.md §1). Both are vectorized ``map_batches`` transforms
over zero-copy Arrow batches.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .. import synth


def geocode_doc_batch(batch: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """Append lon/lat from the integer key (Knuth multiplicative hash —
    synth.geocode_ids, exactly reproducible in SQL)."""
    ids = batch.column(id_col).to_numpy()
    lon, lat = synth.geocode_ids(ids)
    return batch.append_column("lon", pa.array(lon)).append_column(
        "lat", pa.array(lat)
    )


def _md5_frac(data: np.ndarray) -> np.ndarray:
    """sha-style hash fraction per string: (md5 first 8 hex digits)/2^32.
    Matches DuckDB: ('0x' || substr(md5(s), 1, 8))::UBIGINT / 4294967296."""
    out = np.empty(len(data), dtype=np.float64)
    for i, s in enumerate(data):
        h = int(hashlib.md5(s.encode() if isinstance(s, str) else s).hexdigest()[:8], 16)
        out[i] = h / 4294967296.0
    return out


def geocode_url_batch(batch: pa.Table, url_col: str = "url") -> pa.Table:
    """url -> (lon, lat) via md5 fraction (FIXTURES.md §1 derivation:
    lon = -180 + 360*hash_frac(url), lat = -60 + 120*hash_frac(url + '#lat'))."""
    urls = batch.column(url_col).to_pylist()
    lon = -180.0 + 360.0 * _md5_frac(np.array(urls, dtype=object))
    lat = -60.0 + 120.0 * _md5_frac(np.array([u + "#lat" for u in urls], dtype=object))
    return batch.append_column("lon", pa.array(lon)).append_column(
        "lat", pa.array(lat)
    )


def exif_gps_batch(batch: pa.Table, payload_col: str = "payload") -> pa.Table:
    """JPEG payloads -> (lon, lat) from the EXIF GPS IFD
    (functions/jpeg.py exif_gps); rows without GPS are dropped (the
    web-corpus norm — most images carry no location). Feeds the spatial
    stages (pip_join / cell assignment) directly: the multimodal ->
    geospatial bridge."""
    from ..functions.jpeg import exif_gps

    lons, lats, keep = [], [], []
    for i, p in enumerate(batch.column(payload_col).to_pylist()):
        got = exif_gps(p)
        if got is None:
            continue
        keep.append(i)
        lons.append(got[0])
        lats.append(got[1])
    out = batch.take(keep).drop_columns([payload_col])
    return out.append_column(
        "lon", pa.array(np.asarray(lons, np.float64), pa.float64())
    ).append_column(
        "lat", pa.array(np.asarray(lats, np.float64), pa.float64())
    )


def assign_cell_batch(batch: pa.Table, res_deg: float = 3.0) -> pa.Table:
    """Append the flat spatial cell id from lon/lat columns."""
    lon = batch.column("lon").to_numpy()
    lat = batch.column("lat").to_numpy()
    cells = synth.cell_for_lonlat(lon, lat, res_deg)
    return batch.append_column("cell", pa.array(cells, type=pa.int64()))


def morton_cell(lon: np.ndarray, lat: np.ndarray, level: int = 12) -> np.ndarray:
    """Hierarchical quadtree cell id (Morton / Z-order interleave) — the
    S2/H3-style spatial key: the id at level L-1 is ``id >> 2`` of level L,
    so prefix truncation coarsens cells (used for multi-resolution bucketing
    and range-partitioning by key prefix). Pure integer numpy; deterministic
    at any parallelism. 2^level x 2^level cells over lon/lat."""
    n = np.int64(1) << level
    x = np.clip(((np.asarray(lon) + 180.0) / 360.0 * n).astype(np.int64), 0, n - 1)
    y = np.clip(((np.asarray(lat) + 90.0) / 180.0 * n).astype(np.int64), 0, n - 1)
    code = np.zeros(len(x), dtype=np.int64)
    for b in range(level):
        code |= ((x >> b) & 1) << (2 * b)
        code |= ((y >> b) & 1) << (2 * b + 1)
    return code


def assign_morton_batch(batch: pa.Table, level: int = 12) -> pa.Table:
    lon = batch.column("lon").to_numpy()
    lat = batch.column("lat").to_numpy()
    return batch.append_column(
        "morton_cell", pa.array(morton_cell(lon, lat, level), type=pa.int64())
    )


def geocode_documents(ds, res_deg: float = 3.0):
    """documents Dataset -> + lon, lat, cell (chained zero-copy Arrow maps)."""
    return ds.map_batches(geocode_doc_batch, batch_format="pyarrow").map_batches(
        lambda b: assign_cell_batch(b, res_deg), batch_format="pyarrow"
    )
