"""Zone (vector feature) source: a small table of (zone_id, zone_seq, name,
geom_wkb) plus a broadcast-friendly parsed form.

The reference reads features one-by-one from OGR / R sf objects
(/root/reference/src/exactextract/src/gdal_dataset_wrapper.cpp:22-76); here
zones are an Arrow table. Zone sets are typically small relative to rasters
(the 100 TB scale point: ~1e6 zones of ~1 KB WKB ≈ 1 GB — broadcast once via
``ray.put`` and shared read-only by every map task on a node, NOT re-shipped
per batch). For larger-than-memory zone sets the engine would range-partition
zones by tile extent; that path is not needed at current scales.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from .. import synth, wkbio
from ..grid import Box


@dataclass
class ZoneSet:
    """Parsed, broadcastable zone collection with an envelope bucket index."""

    zone_ids: np.ndarray  # int64
    zone_seq: np.ndarray  # int64 input order
    parts: list[list[dict]]  # parsed geometry parts per zone
    envelopes: np.ndarray  # (n, 4) xmin, ymin, xmax, ymax

    def __len__(self) -> int:
        return len(self.zone_ids)

    def intersecting(self, box: Box) -> np.ndarray:
        """Indices of zones whose envelope intersects box (vectorized)."""
        e = self.envelopes
        m = (
            (e[:, 0] < box.xmax)
            & (e[:, 2] > box.xmin)
            & (e[:, 1] < box.ymax)
            & (e[:, 3] > box.ymin)
        )
        return np.nonzero(m)[0]


def parse_zone_table(tbl: pa.Table) -> ZoneSet:
    zone_ids = tbl.column("zone_id").to_numpy()
    if "zone_seq" in tbl.column_names:
        zone_seq = tbl.column("zone_seq").to_numpy()
    else:
        zone_seq = np.arange(len(zone_ids), dtype=np.int64)
    parts = []
    envs = np.empty((len(zone_ids), 4))
    wkbs = tbl.column("geom_wkb").to_pylist()
    for i, wkb in enumerate(wkbs):
        p = wkbio.parse_wkb(wkb)
        parts.append(p)
        envs[i] = wkbio.parts_envelope(p)
    return ZoneSet(
        zone_ids=np.asarray(zone_ids, dtype=np.int64),
        zone_seq=np.asarray(zone_seq, dtype=np.int64),
        parts=parts,
        envelopes=envs,
    )


def zone_table(zone_rows: list[tuple[int, str, bytes]]) -> pa.Table:
    """(zone_id, name, wkb) rows -> Arrow zones table."""
    return pa.table(
        {
            "zone_id": pa.array([r[0] for r in zone_rows], type=pa.int64()),
            "zone_seq": pa.array(range(len(zone_rows)), type=pa.int64()),
            "name": pa.array([r[1] for r in zone_rows], type=pa.string()),
            "geom_wkb": pa.array([r[2] for r in zone_rows], type=pa.binary()),
        }
    )


def synth_rect_zones(num_zones: int, n: int = 64) -> pa.Table:
    """Quarter-cell-aligned rectangle zones matching synth.synth_rect_zones_sql."""
    rows = []
    for k in range(num_zones):
        xmin, ymin, xmax, ymax = synth.synth_rect_zone_bounds(k, n)
        rows.append((k, f"zone{k}", wkbio.rect_wkb(xmin, ymin, xmax, ymax)))
    return zone_table(rows)


def fixture_zones(n: int = 64) -> pa.Table:
    """The FIXTURES.md §2 shape mix: rectangles, circles, a multipolygon, a
    polygon with a hole, a continental skew zone, and one fully outside."""
    f = float(n)
    rows = [
        (0, "rect_small", wkbio.rect_wkb(0.5, 0.5, 2.5, 2.5)),
        (1, "rect_quarter", wkbio.rect_wkb(f * 0.25, f * 0.25, f * 0.5, f * 0.55)),
        (2, "circle", wkbio.circle_wkb(f * 0.6, f * 0.4, f * 0.15)),
        (
            3,
            "multipoly",
            wkbio.multipolygon_wkb(
                [
                    (
                        [(1, 1), (3, 1), (3, 3), (1, 3), (1, 1)],
                        [],
                    ),
                    (
                        [
                            (f - 3, f - 3),
                            (f - 1, f - 3),
                            (f - 1, f - 1),
                            (f - 3, f - 1),
                            (f - 3, f - 3),
                        ],
                        [],
                    ),
                ]
            ),
        ),
        (
            4,
            "holey",
            wkbio.polygon_wkb(
                [
                    (f * 0.1, f * 0.6),
                    (f * 0.4, f * 0.6),
                    (f * 0.4, f * 0.9),
                    (f * 0.1, f * 0.9),
                    (f * 0.1, f * 0.6),
                ],
                holes=[
                    [
                        (f * 0.2, f * 0.7),
                        (f * 0.3, f * 0.7),
                        (f * 0.3, f * 0.8),
                        (f * 0.2, f * 0.8),
                        (f * 0.2, f * 0.7),
                    ]
                ],
            ),
        ),
        # continental skew zone: ~40% of the grid (skew-splitting exercised)
        (5, "continental", wkbio.rect_wkb(0.25, 0.25, f * 0.65, f * 0.65)),
        # entirely outside the raster (zero-row/NA contract)
        (6, "outside", wkbio.rect_wkb(f + 5, f + 5, f + 8, f + 8)),
    ]
    return zone_table(rows)


def synth_line_zones(num: int, n: int = 64) -> pa.Table:
    """Horizontal line zones matching synth.synth_line_zones_sql."""
    rows = []
    for k in range(num):
        y, x0, x1 = synth.synth_line_zone(k, n)
        rows.append((k, f"line{k}", wkbio.linestring_wkb([(x0, y), (x1, y)])))
    return zone_table(rows)


def synth_geo_zones(num_zones: int) -> pa.Table:
    """Rectangular lon/lat zones for the PIP join, matching
    synth.synth_geo_zones_sql."""
    rows = []
    for k in range(num_zones):
        xmin, ymin, xmax, ymax = synth.synth_geo_zone_bounds(k)
        rows.append((k, f"geozone{k}", wkbio.rect_wkb(xmin, ymin, xmax, ymax)))
    return zone_table(rows)


def read_shp_zones(
    path: str,
    name_col: str | None = None,
    id_col: str | None = None,
    target_crs: str = "EPSG:4326",
) -> pa.Table:
    """ESRI Shapefile -> the engine's zones table (zone_id, zone_seq, name,
    geom_wkb), with automatic CRS transform from the ``.prj`` sidecar.

    The OGR analog of the reference's vector ingestion
    (gdal_dataset_wrapper.cpp:22-76) + its warn-and-transform contract
    (R/exact_extract.R:360-377). Ring grouping follows the ESRI spec:
    clockwise rings are outers (negative shoelace area in x-east/y-north
    axes), counterclockwise rings are holes assigned to the outer whose
    envelope contains their first vertex."""
    import os

    from .sinks import read_dbf, read_shp

    recs = read_shp(path)
    base = path[:-4]
    attrs = None
    if os.path.exists(base + ".dbf"):
        attrs = read_dbf(base + ".dbf")

    def signed_area(r: np.ndarray) -> float:
        x, y = r[:, 0], r[:, 1]
        return 0.5 * float(
            np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)
        )

    rows = []
    for i, rings in enumerate(recs):
        outers: list[tuple[np.ndarray, list]] = []
        holes: list[np.ndarray] = []
        for r in rings:
            if signed_area(r) <= 0:  # clockwise -> outer (ESRI spec)
                outers.append((r, []))
            else:
                holes.append(r)
        for h in holes:
            px, py = float(h[0, 0]), float(h[0, 1])
            target = next(
                (o for o in outers
                 if o[0][:, 0].min() <= px <= o[0][:, 0].max()
                 and o[0][:, 1].min() <= py <= o[0][:, 1].max()),
                outers[0] if outers else None,
            )
            if target is not None:
                target[1].append(h)
        if not outers:
            continue
        if id_col is not None and attrs is not None:
            zid = int(attrs[id_col].iloc[i])
        else:
            zid = i
        if name_col is None and attrs is not None:
            name_col_eff = next(
                (c for c in attrs.columns
                 if c.lower() in ("name", "nome", "label")), None)
        else:
            name_col_eff = name_col
        name = (
            str(attrs[name_col_eff].iloc[i])
            if attrs is not None and name_col_eff is not None
            else f"zone{zid}"
        )
        if len(outers) == 1:
            wkb = wkbio.polygon_wkb(outers[0][0], outers[0][1])
        else:
            wkb = wkbio.multipolygon_wkb([(o[0], o[1]) for o in outers])
        rows.append((zid, name, wkb))
    tbl = zone_table(rows)

    if os.path.exists(base + ".prj"):
        from ..functions.crs import parse_crs_wkt, transform_zone_table

        wkt = open(base + ".prj").read()
        if parse_crs_wkt(wkt) is not None and target_crs is not None:
            tbl = transform_zone_table(tbl, wkt, target_crs)
    return tbl
