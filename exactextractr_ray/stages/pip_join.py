"""Point-in-polygon spatial join as an actor-pool map_batches stage.

The Ray-native analog of the reference's broadcast spatial hash join: the
RasterSequentialProcessor builds a GEOS STRtree over all features and probes
it per subgrid (/root/reference/src/exactextract/src/
raster_sequential_processor.cpp:31-58). Here the zone set is broadcast via
``ray.put`` and each actor builds a bucket-grid spatial index ONCE in
``__init__``; per batch it does vectorized even-odd ray casting (numpy, no
GEOS in this environment) against candidate zones only.

Join semantics: inner — points matching no zone are dropped; a point inside k
overlapping zones emits k rows. Output rows carry all input columns plus
``zone_id``; row multiset is independent of batch/block boundaries, so counts
are bit-stable across parallelism levels (BASELINE.json requirement).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from ..sources.zones import ZoneSet, parse_zone_table


def point_in_parts(px: np.ndarray, py: np.ndarray, parts: list[dict]) -> np.ndarray:
    """Vectorized even-odd point-in-polygon over all rings of all parts.

    Even-odd counting makes holes subtract regardless of ring orientation.
    Boundary behavior follows the half-open ray-cast rule (measure-zero for
    hashed point locations).
    """
    inside = np.zeros(len(px), dtype=bool)
    for part in parts:
        if part["type"] != "Polygon":
            continue
        for ring in part["rings"]:
            x0, y0 = ring[:-1, 0], ring[:-1, 1]
            x1, y1 = ring[1:, 0], ring[1:, 1]
            dy = y1 - y0
            valid = dy != 0.0
            x0v, y0v, x1v, y1v, dyv = x0[valid], y0[valid], x1[valid], y1[valid], dy[valid]
            # edges x points: crossing where the horizontal ray to +inf
            # intersects the edge
            cond = (y0v[None, :] > py[:, None]) != (y1v[None, :] > py[:, None])
            with np.errstate(invalid="ignore", divide="ignore"):
                xint = x0v[None, :] + (py[:, None] - y0v[None, :]) * (
                    x1v[None, :] - x0v[None, :]
                ) / dyv[None, :]
            crossings = cond & (px[:, None] < xint)
            inside ^= (crossings.sum(axis=1) % 2).astype(bool)
    return inside


def winding_number(px: np.ndarray, py: np.ndarray, parts: list[dict]) -> np.ndarray:
    """Signed winding number per point (rings as normalized by wkbio: shells
    CCW -> +1, holes CW -> -1; self-overlapping shells accumulate, matching
    the coverage kernel's >1 semantics)."""
    w = np.zeros(len(px), dtype=np.int64)
    for part in parts:
        if part["type"] != "Polygon":
            continue
        for ring in part["rings"]:
            x0, y0 = ring[:-1, 0], ring[:-1, 1]
            x1, y1 = ring[1:, 0], ring[1:, 1]
            dy = y1 - y0
            valid = dy != 0.0
            x0v, y0v, x1v, y1v, dyv = x0[valid], y0[valid], x1[valid], y1[valid], dy[valid]
            up = dyv > 0
            with np.errstate(invalid="ignore", divide="ignore"):
                xint = x0v[None, :] + (py[:, None] - y0v[None, :]) * (
                    x1v[None, :] - x0v[None, :]
                ) / dyv[None, :]
            left = px[:, None] < xint
            upcross = (y0v[None, :] <= py[:, None]) & (py[:, None] < y1v[None, :])
            dncross = (y1v[None, :] <= py[:, None]) & (py[:, None] < y0v[None, :])
            w += (upcross & up[None, :] & left).sum(axis=1)
            w -= (dncross & ~up[None, :] & left).sum(axis=1)
    return w


class EdgeIndex:
    """Y-banded edge index for HIGH-VERTEX polygons (coastlines): the
    even-odd test touches only edges whose y-span overlaps the point's band
    instead of all edges — O(points/band x edges/band) per band rather than
    O(points x edges). Crossing counts are integer sums over a PARTITION of
    the edge set, so results are bit-identical to the unindexed test."""

    def __init__(self, parts: list[dict], nbands: int = 128):
        xs0, ys0, xs1, ys1 = [], [], [], []
        for part in parts:
            if part["type"] != "Polygon":
                continue
            for ring in part["rings"]:
                x0, y0 = ring[:-1, 0], ring[:-1, 1]
                x1, y1 = ring[1:, 0], ring[1:, 1]
                m = (y1 - y0) != 0.0
                xs0.append(x0[m])
                ys0.append(y0[m])
                xs1.append(x1[m])
                ys1.append(y1[m])
        if xs0:
            self.x0 = np.concatenate(xs0)
            self.y0 = np.concatenate(ys0)
            self.x1 = np.concatenate(xs1)
            self.y1 = np.concatenate(ys1)
        else:
            self.x0 = self.y0 = self.x1 = self.y1 = np.empty(0)
        self.n_edges = len(self.x0)
        self.dy = self.y1 - self.y0
        ymin_e = np.minimum(self.y0, self.y1)
        ymax_e = np.maximum(self.y0, self.y1)
        self.ylo = float(ymin_e.min()) if self.n_edges else 0.0
        self.yhi = float(ymax_e.max()) if self.n_edges else 1.0
        self.nb = nbands
        self.sy = (self.yhi - self.ylo) / nbands or 1.0
        b0 = np.clip(((ymin_e - self.ylo) / self.sy).astype(np.int64), 0, nbands - 1)
        b1 = np.clip(((ymax_e - self.ylo) / self.sy).astype(np.int64), 0, nbands - 1)
        self.band_edges = [
            np.nonzero((b0 <= b) & (b1 >= b))[0] for b in range(nbands)
        ]

    def _bands_of(self, py: np.ndarray):
        """Group point indices by band; out-of-range points never cross."""
        inb = (py >= self.ylo) & (py <= self.yhi)
        bp = np.clip(((py - self.ylo) / self.sy).astype(np.int64), 0, self.nb - 1)
        bp = np.where(inb, bp, -1)
        order = np.argsort(bp, kind="stable")
        sb = bp[order]
        uniq = np.unique(sb[sb >= 0])
        starts = np.searchsorted(sb, uniq, side="left")
        ends = np.searchsorted(sb, uniq, side="right")
        for b, s, t in zip(uniq.tolist(), starts.tolist(), ends.tolist()):
            yield int(b), order[s:t]

    def point_in(self, px: np.ndarray, py: np.ndarray) -> np.ndarray:
        """Even-odd containment, bit-identical to point_in_parts."""
        cross = np.zeros(len(px), dtype=np.int64)
        for b, pts in self._bands_of(py):
            e = self.band_edges[b]
            if len(e) == 0:
                continue
            x0, y0 = self.x0[e], self.y0[e]
            x1, y1 = self.x1[e], self.y1[e]
            dy = self.dy[e]
            pyb = py[pts][:, None]
            cond = (y0[None, :] > pyb) != (y1[None, :] > pyb)
            with np.errstate(invalid="ignore", divide="ignore"):
                xint = x0[None, :] + (pyb - y0[None, :]) * (
                    x1[None, :] - x0[None, :]
                ) / dy[None, :]
            cross[pts] += (cond & (px[pts][:, None] < xint)).sum(axis=1)
        return (cross % 2).astype(bool)

    def winding(self, px: np.ndarray, py: np.ndarray) -> np.ndarray:
        """Signed winding number, bit-identical to winding_number."""
        w = np.zeros(len(px), dtype=np.int64)
        for b, pts in self._bands_of(py):
            e = self.band_edges[b]
            if len(e) == 0:
                continue
            x0, y0 = self.x0[e], self.y0[e]
            x1, y1 = self.x1[e], self.y1[e]
            dy = self.dy[e]
            up = dy > 0
            pyb = py[pts][:, None]
            with np.errstate(invalid="ignore", divide="ignore"):
                xint = x0[None, :] + (pyb - y0[None, :]) * (
                    x1[None, :] - x0[None, :]
                ) / dy[None, :]
            left = px[pts][:, None] < xint
            upcross = (y0[None, :] <= pyb) & (pyb < y1[None, :])
            dncross = (y1[None, :] <= pyb) & (pyb < y0[None, :])
            w[pts] += (upcross & up[None, :] & left).sum(axis=1)
            w[pts] -= (dncross & ~up[None, :] & left).sum(axis=1)
        return w


#: build an EdgeIndex for zones with at least this many edges; below it the
#: flat vectorized test is faster (no banding overhead)
_EDGE_INDEX_MIN_EDGES = 256


class _BucketIndex:
    """Coarse uniform-grid envelope index over a ZoneSet (per-actor state)."""

    def __init__(self, zones: ZoneSet, nb: int = 64):
        self.zones = zones
        e = zones.envelopes
        self.xmin = float(e[:, 0].min())
        self.ymin = float(e[:, 1].min())
        self.xmax = float(e[:, 2].max())
        self.ymax = float(e[:, 3].max())
        self.nb = nb
        self.sx = (self.xmax - self.xmin) / nb or 1.0
        self.sy = (self.ymax - self.ymin) / nb or 1.0
        self.buckets: dict[int, list[int]] = {}
        for zi in range(len(zones)):
            bx0 = int((e[zi, 0] - self.xmin) / self.sx)
            bx1 = int((e[zi, 2] - self.xmin) / self.sx)
            by0 = int((e[zi, 1] - self.ymin) / self.sy)
            by1 = int((e[zi, 3] - self.ymin) / self.sy)
            for by in range(max(by0, 0), min(by1, self.nb - 1) + 1):
                for bx in range(max(bx0, 0), min(bx1, self.nb - 1) + 1):
                    self.buckets.setdefault(by * nb + bx, []).append(zi)

    def candidates(self, px: np.ndarray, py: np.ndarray):
        """Yield (zone_index, point_index_array) candidate pairs."""
        bx = np.floor((px - self.xmin) / self.sx).astype(np.int64)
        by = np.floor((py - self.ymin) / self.sy).astype(np.int64)
        inb = (bx >= 0) & (bx < self.nb) & (by >= 0) & (by < self.nb)
        bid = by * self.nb + bx
        bid[~inb] = -1
        order = np.argsort(bid, kind="stable")
        sorted_bid = bid[order]
        uniq = np.unique(sorted_bid[sorted_bid >= 0])
        per_zone: dict[int, list[np.ndarray]] = {}
        starts = np.searchsorted(sorted_bid, uniq, side="left")
        ends = np.searchsorted(sorted_bid, uniq, side="right")
        for b, s, t in zip(uniq.tolist(), starts.tolist(), ends.tolist()):
            zlist = self.buckets.get(b)
            if not zlist:
                continue
            pts = order[s:t]
            for zi in zlist:
                per_zone.setdefault(zi, []).append(pts)
        for zi, chunks in per_zone.items():
            yield zi, np.concatenate(chunks)


class PIPJoinZones:
    """map_batches(PIPJoinZones, concurrency=N) — stateful actor stage."""

    def __init__(self, zones_ref, lon_col: str = "lon", lat_col: str = "lat"):
        zones = ray.get(zones_ref) if not isinstance(zones_ref, ZoneSet) else zones_ref
        self.index = _BucketIndex(zones)
        self.zones = zones
        self.lon_col = lon_col
        self.lat_col = lat_col
        # per-zone edge indexes for high-vertex polygons (coastlines): built
        # once per actor; small zones keep the flat test
        self.edge_index: dict[int, EdgeIndex] = {}
        for zi in range(len(zones)):
            n_edges = sum(
                len(r) - 1
                for p in zones.parts[zi]
                if p["type"] == "Polygon"
                for r in p["rings"]
            )
            if n_edges >= _EDGE_INDEX_MIN_EDGES:
                self.edge_index[zi] = EdgeIndex(zones.parts[zi])

    def __call__(self, batch: pa.Table) -> pa.Table:
        px = batch.column(self.lon_col).to_numpy().astype(np.float64)
        py = batch.column(self.lat_col).to_numpy().astype(np.float64)
        take_idx: list[np.ndarray] = []
        zone_ids: list[np.ndarray] = []
        for zi, pts in self.index.candidates(px, py):
            e = self.zones.envelopes[zi]
            m = (px[pts] >= e[0]) & (px[pts] <= e[2]) & (py[pts] >= e[1]) & (
                py[pts] <= e[3]
            )
            pts = pts[m]
            if len(pts) == 0:
                continue
            eidx = self.edge_index.get(zi)
            if eidx is not None:
                hit = eidx.point_in(px[pts], py[pts])
            else:
                hit = point_in_parts(px[pts], py[pts], self.zones.parts[zi])
            pts = pts[hit]
            if len(pts) == 0:
                continue
            take_idx.append(pts)
            zone_ids.append(np.full(len(pts), self.zones.zone_ids[zi], dtype=np.int64))
        if not take_idx:
            empty = batch.slice(0, 0)
            return empty.append_column("zone_id", pa.array([], type=pa.int64()))
        idx = np.concatenate(take_idx)
        zids = np.concatenate(zone_ids)
        # deterministic row order within the batch: by (point index, zone_id)
        order = np.lexsort((zids, idx))
        out = batch.take(pa.array(idx[order]))
        return out.append_column("zone_id", pa.array(zids[order], type=pa.int64()))


def pip_join(
    ds, zones: pa.Table, lon_col="lon", lat_col="lat", concurrency=None,
    actors: bool = False,
):
    """points Dataset x zones table -> inner spatial join Dataset."""
    from ..util import cached_stage

    zset = parse_zone_table(zones)
    zones_ref = ray.put(zset)
    # batch_size=None: process whole blocks — point rows are ~24 bytes so
    # even multi-million-row blocks are small, and Ray's batch re-slicing +
    # output concatenation costs ~2x throughput when enabled (measured)
    if actors:
        return ds.map_batches(
            PIPJoinZones,
            fn_constructor_args=(zones_ref, lon_col, lat_col),
            batch_format="pyarrow",
            batch_size=None,
            concurrency=concurrency or (1, 8),
        )
    return ds.map_batches(
        cached_stage(PIPJoinZones, zones_ref, lon_col, lat_col),
        batch_format="pyarrow",
        batch_size=None,
    )
