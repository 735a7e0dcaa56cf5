"""Mixed-resolution value/weight zonal statistics — the RasterView
disaggregation path of the reference (/root/reference/src/exactextract/src/
raster.h:248-312; weighted-multiresolution semantics
test_stats.cpp:101-129):

* the two grids must be compatible (resolutions integer multiples, aligned
  origins — grid.h compatible_with);
* both rasters are viewed on the COMMON (finest) grid by integer-factor
  replication; coverage fractions are computed on the common grid;
* 'count'/'sum' are forbidden when the VALUE raster is disaggregated
  (/root/reference/src/exact_extract.cpp:329-332).

Ray shape (100-TB-safe — neither raster ever touches the driver):

1. a vectorized ``map_batches`` over WEIGHT tiles clips each weight tile to
   the weight-window of every VALUE tile it overlaps and emits the clipped
   fragments keyed by the value tile's ``tile_id`` (the focal-halo fanout
   pattern, pipelines/focal.py);
2. value tiles union with the fragments and ONE ``groupby(tile_id)``
   shuffle co-locates each value tile with exactly the weight cells its
   common-grid window needs;
3. the per-group assembler rebuilds the (NaN-padded) weight window, views
   both rasters on the common grid by integer replication, and runs the
   normal coverage -> partial-stats kernel; the usual ``groupby(zone_id)``
   merge finalizes.

Zones stay a ``ray.put`` broadcast (the legitimately small side). Both
fanout stages consult the zone envelopes and drop tiles no zone touches, so
the shuffle carries only the zone-covered fraction of both rasters.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ..grid import Box, Grid
from ..sources.zones import parse_zone_table
from ..stats import STORED_VALUE_STATS, RasterStats
from ..coverage import coverage_matrix
from ..util import cached_stage
from .zonal import (
    _empty_partial_table,
    _partial_schema,
    merge_partial_group,
)

_PAIR_SCHEMA = pa.schema(
    [
        ("tile_id", pa.int64()),  # VALUE tile id (the co-partition key)
        ("kind", pa.int8()),  # 0 = value tile, 1 = weight fragment
        ("row0", pa.int32()),  # native-grid coords (value grid for kind=0,
        ("col0", pa.int32()),  # weight grid for kind=1)
        ("h", pa.int32()),
        ("w", pa.int32()),
        ("values", pa.list_(pa.float64())),
    ]
)


class _MixedGeom:
    """Shared grid arithmetic for the two fanout stages and the assembler."""

    def __init__(self, value_grid: dict, weight_grid: dict,
                 tile_h: int, tile_w: int):
        self.vg = Grid.from_dict(value_grid)
        self.wg = Grid.from_dict(weight_grid)
        self.tile_h = tile_h
        self.tile_w = tile_w
        common_dx = min(self.vg.dx, self.wg.dx)
        common_dy = min(self.vg.dy, self.wg.dy)
        self.fv_x = int(round(self.vg.dx / common_dx))
        self.fv_y = int(round(self.vg.dy / common_dy))
        self.fw_x = int(round(self.wg.dx / common_dx))
        self.fw_y = int(round(self.wg.dy / common_dy))
        self.common = Grid(
            self.vg.xmin, self.vg.ymin, self.vg.xmax, self.vg.ymax,
            common_dx, common_dy,
        )
        # aligned-but-offset weight grids: origin shift in common cells
        # (compatible_with guarantees these are integers within tol)
        self.off_x = int(round((self.vg.xmin - self.wg.xmin) / common_dx))
        self.off_y = int(round((self.wg.ymax - self.vg.ymax) / common_dy))
        self.tiles_x = (self.vg.ncol + tile_w - 1) // tile_w
        self.tiles_y = (self.vg.nrow + tile_h - 1) // tile_h

    def value_tile_window(self, tid: int):
        """Value tile id -> (row0, col0, th, tw) on the VALUE grid."""
        ty, tx = tid // self.tiles_x, tid % self.tiles_x
        row0, col0 = ty * self.tile_h, tx * self.tile_w
        th = min(self.tile_h, self.vg.nrow - row0)
        tw = min(self.tile_w, self.vg.ncol - col0)
        return row0, col0, th, tw

    def common_window(self, row0: int, col0: int, th: int, tw: int):
        """Value-grid window -> (crow0, ccol0, cth, ctw) on the common grid."""
        return row0 * self.fv_y, col0 * self.fv_x, th * self.fv_y, tw * self.fv_x

    def needed_weight_rows(self, crow0: int, cth: int):
        """Common-row span -> inclusive global weight-row span (may extend
        past the weight raster's extent; missing rows stay NaN = NODATA)."""
        return (crow0 + self.off_y) // self.fw_y, (
            crow0 + cth - 1 + self.off_y
        ) // self.fw_y

    def needed_weight_cols(self, ccol0: int, ctw: int):
        return (ccol0 + self.off_x) // self.fw_x, (
            ccol0 + ctw - 1 + self.off_x
        ) // self.fw_x


class WeightFanout:
    """WEIGHT tiles -> clipped fragments keyed by overlapping VALUE tile_id.

    Per fragment, only the weight cells inside that value tile's needed
    window ship — shuffle volume is bounded by (covered value area) x
    (weight cell density), independent of weight tile layout.
    """

    def __init__(self, zones_ref, value_grid: dict, weight_grid: dict,
                 tile_h: int, tile_w: int):
        self.zones = ray.get(zones_ref) if zones_ref is not None else None
        self.geo = _MixedGeom(value_grid, weight_grid, tile_h, tile_w)

    def __call__(self, batch: pa.Table) -> pa.Table:
        geo = self.geo
        row0s = batch.column("row0").to_numpy()
        col0s = batch.column("col0").to_numpy()
        ths = batch.column("th").to_numpy()
        tws = batch.column("tw").to_numpy()
        values_col = batch.column("values")

        tids, r0s, c0s, hs, ws = [], [], [], [], []
        frags: list[np.ndarray] = []
        for i in range(batch.num_rows):
            wr0, wc0, wth, wtw = (
                int(row0s[i]), int(col0s[i]), int(ths[i]), int(tws[i])
            )
            wv = np.asarray(values_col[i].values, dtype=np.float64).reshape(
                wth, wtw
            )
            # common-grid span this weight tile covers
            cr_lo = max(wr0 * geo.fw_y - geo.off_y, 0)
            cr_hi = min((wr0 + wth) * geo.fw_y - 1 - geo.off_y,
                        geo.common.nrow - 1)
            cc_lo = max(wc0 * geo.fw_x - geo.off_x, 0)
            cc_hi = min((wc0 + wtw) * geo.fw_x - 1 - geo.off_x,
                        geo.common.ncol - 1)
            if cr_lo > cr_hi or cc_lo > cc_hi:
                continue
            # value-tile span (common rows -> value rows -> tile rows)
            ty0 = (cr_lo // geo.fv_y) // geo.tile_h
            ty1 = min((cr_hi // geo.fv_y) // geo.tile_h, geo.tiles_y - 1)
            tx0 = (cc_lo // geo.fv_x) // geo.tile_w
            tx1 = min((cc_hi // geo.fv_x) // geo.tile_w, geo.tiles_x - 1)
            for ty in range(ty0, ty1 + 1):
                for tx in range(tx0, tx1 + 1):
                    tid = ty * geo.tiles_x + tx
                    vr0, vc0, vth, vtw = geo.value_tile_window(tid)
                    crow0, ccol0, cth, ctw = geo.common_window(
                        vr0, vc0, vth, vtw
                    )
                    if self.zones is not None:
                        sub = geo.common.subgrid(crow0, ccol0, cth, ctw)
                        if len(self.zones.intersecting(sub.extent)) == 0:
                            continue
                    nwr0, nwr1 = geo.needed_weight_rows(crow0, cth)
                    nwc0, nwc1 = geo.needed_weight_cols(ccol0, ctw)
                    fr0 = max(nwr0, wr0)
                    fr1 = min(nwr1, wr0 + wth - 1)
                    fc0 = max(nwc0, wc0)
                    fc1 = min(nwc1, wc0 + wtw - 1)
                    if fr0 > fr1 or fc0 > fc1:
                        continue
                    frag = wv[fr0 - wr0 : fr1 - wr0 + 1,
                              fc0 - wc0 : fc1 - wc0 + 1]
                    tids.append(tid)
                    r0s.append(fr0)
                    c0s.append(fc0)
                    hs.append(frag.shape[0])
                    ws.append(frag.shape[1])
                    frags.append(frag.ravel())
        flat = np.concatenate(frags) if frags else np.empty(0, np.float64)
        offsets = np.zeros(len(frags) + 1, np.int32)
        if frags:
            np.cumsum([len(f) for f in frags], out=offsets[1:])
        return pa.table(
            {
                "tile_id": pa.array(tids, pa.int64()),
                "kind": pa.array(np.ones(len(tids), np.int8), pa.int8()),
                "row0": pa.array(r0s, pa.int32()),
                "col0": pa.array(c0s, pa.int32()),
                "h": pa.array(hs, pa.int32()),
                "w": pa.array(ws, pa.int32()),
                "values": pa.ListArray.from_arrays(
                    pa.array(offsets, pa.int32()),
                    pa.array(flat, pa.float64()),
                ),
            },
            schema=_PAIR_SCHEMA,
        )


class ValueFanout:
    """VALUE tiles -> kind=0 rows in the shared pair schema (zone-pruned)."""

    def __init__(self, zones_ref, value_grid: dict, weight_grid: dict,
                 tile_h: int, tile_w: int, value_layer: str):
        self.zones = ray.get(zones_ref) if zones_ref is not None else None
        self.geo = _MixedGeom(value_grid, weight_grid, tile_h, tile_w)
        self.value_layer = value_layer

    def __call__(self, batch: pa.Table) -> pa.Table:
        geo = self.geo
        layers = batch.column("layer").to_pylist()
        tile_ids = batch.column("tile_id").to_numpy()
        row0s = batch.column("row0").to_numpy()
        col0s = batch.column("col0").to_numpy()
        ths = batch.column("th").to_numpy()
        tws = batch.column("tw").to_numpy()
        values_col = batch.column("values")
        keep, arrs = [], []
        for i, lay in enumerate(layers):
            if lay != self.value_layer:
                continue
            if self.zones is not None:
                crow0, ccol0, cth, ctw = geo.common_window(
                    int(row0s[i]), int(col0s[i]), int(ths[i]), int(tws[i])
                )
                sub = geo.common.subgrid(crow0, ccol0, cth, ctw)
                if len(self.zones.intersecting(sub.extent)) == 0:
                    continue
            keep.append(i)
            arrs.append(np.asarray(values_col[i].values, dtype=np.float64))
        flat = np.concatenate(arrs) if arrs else np.empty(0, np.float64)
        offsets = np.zeros(len(arrs) + 1, np.int32)
        if arrs:
            np.cumsum([len(a) for a in arrs], out=offsets[1:])
        k = np.asarray(keep, dtype=np.int64)
        return pa.table(
            {
                "tile_id": pa.array(tile_ids[k], pa.int64()),
                "kind": pa.array(np.zeros(len(k), np.int8), pa.int8()),
                "row0": pa.array(row0s[k].astype(np.int32), pa.int32()),
                "col0": pa.array(col0s[k].astype(np.int32), pa.int32()),
                "h": pa.array(ths[k].astype(np.int32), pa.int32()),
                "w": pa.array(tws[k].astype(np.int32), pa.int32()),
                "values": pa.ListArray.from_arrays(
                    pa.array(offsets, pa.int32()),
                    pa.array(flat, pa.float64()),
                ),
            },
            schema=_PAIR_SCHEMA,
        )


class MixedGroupStats:
    """One co-partitioned group (value tile + its weight fragments) ->
    partial-stat rows. Constructed once per worker via ``cached_stage``."""

    def __init__(self, zones_ref, value_grid: dict, weight_grid: dict,
                 tile_h: int, tile_w: int, store_values: bool):
        self.zones = ray.get(zones_ref)
        self.geo = _MixedGeom(value_grid, weight_grid, tile_h, tile_w)
        self.store_values = store_values

    def __call__(self, group: pa.Table) -> pa.Table:
        geo = self.geo
        kinds = group.column("kind").to_numpy()
        body = np.nonzero(kinds == 0)[0]
        if len(body) == 0:
            # fragments for a value tile whose value row was zone-pruned
            # upstream cannot occur (both fanouts apply the same prune),
            # but guard anyway
            return _empty_partial_table()
        bi = int(body[0])
        r0s = group.column("row0").to_numpy()
        c0s = group.column("col0").to_numpy()
        hs = group.column("h").to_numpy()
        ws = group.column("w").to_numpy()
        values = group.column("values").combine_chunks()
        tid = int(group.column("tile_id")[0].as_py())

        row0, col0 = int(r0s[bi]), int(c0s[bi])
        th, tw = int(hs[bi]), int(ws[bi])
        crow0, ccol0, cth, ctw = geo.common_window(row0, col0, th, tw)
        tile_grid = geo.common.subgrid(crow0, ccol0, cth, ctw)
        zidx = self.zones.intersecting(tile_grid.extent)
        if len(zidx) == 0:
            return _empty_partial_table()

        vals = np.asarray(values[bi].values, dtype=np.float64).reshape(th, tw)
        vals_c = np.repeat(
            np.repeat(vals, geo.fv_y, axis=0), geo.fv_x, axis=1
        )

        # assemble the needed weight window from fragments; rows/cols the
        # weight raster doesn't cover stay NaN (NODATA poisons weighted
        # sums, matching the reference's outside-extent get() —
        # test_exact_extract.R:626-641; never edge-clamped)
        nwr0, nwr1 = geo.needed_weight_rows(crow0, cth)
        nwc0, nwc1 = geo.needed_weight_cols(ccol0, ctw)
        canvas = np.full((nwr1 - nwr0 + 1, nwc1 - nwc0 + 1), np.nan)
        for j in range(group.num_rows):
            if kinds[j] != 1:
                continue
            fr0, fc0 = int(r0s[j]) - nwr0, int(c0s[j]) - nwc0
            fh, fw = int(hs[j]), int(ws[j])
            frag = np.asarray(values[j].values, dtype=np.float64).reshape(
                fh, fw
            )
            canvas[fr0 : fr0 + fh, fc0 : fc0 + fw] = frag
        # common-grid weight view via integer index mapping into the canvas
        wr = (crow0 + np.arange(cth) + geo.off_y) // geo.fw_y - nwr0
        wc = (ccol0 + np.arange(ctw) + geo.off_x) // geo.fw_x - nwc0
        w_c = canvas[np.ix_(wr, wc)]

        out_rows: list[dict] = []
        for zi in zidx:
            e = self.zones.envelopes[zi]
            sub = tile_grid.crop_to_box(Box(e[0], e[1], e[2], e[3]))
            if sub.empty():
                continue
            cov = coverage_matrix(sub, self.zones.parts[zi])
            if not np.any(cov):
                continue
            r0 = sub.row_offset(tile_grid)
            c0 = sub.col_offset(tile_grid)
            st = RasterStats(store_values=self.store_values)
            st.process(
                vals_c[r0 : r0 + sub.nrow, c0 : c0 + sub.ncol],
                cov,
                w_c[r0 : r0 + sub.nrow, c0 : c0 + sub.ncol],
            )
            row = st.to_row()
            row["zone_id"] = int(self.zones.zone_ids[zi])
            row["tile_id"] = tid
            row["pair_idx"] = 0
            out_rows.append(row)
        if not out_rows:
            return _empty_partial_table()
        return pa.Table.from_pylist(out_rows, schema=_partial_schema())


def exact_extract_mixed(
    value_raster,
    weight_raster,
    zones: pa.Table,
    stats: list[str],
    value_layer: str = "value",
    weight_layer: str = "value",
    quantiles: list[float] | None = None,
    grid_compat_tol: float = 1e-3,
) -> pa.Table:
    """Zonal stats with value and weight rasters on different (compatible)
    grids. Mirrors exact_extract(..., weights=<other-res raster>).

    Both rasters stream: the weight raster is clipped and co-partitioned
    with the value tiles by ``tile_id`` (one shuffle) — nothing is ever
    materialized on the driver."""
    vg, wg = value_raster.grid, weight_raster.grid
    if not vg.compatible_with(wg, grid_compat_tol):
        raise ValueError("value and weight grids are not compatible")
    value_disaggregated = vg.dx > wg.dx or vg.dy > wg.dy
    if value_disaggregated and ({"count", "sum"} & set(stats)):
        raise ValueError(
            "Cannot compute 'count' or 'sum' when value raster is "
            "disaggregated to resolution of weights."
        )
    if value_disaggregated:
        # test_exact_extract_errors.R:355-372
        import warnings

        warnings.warn(
            "value raster implicitly disaggregated to match resolution of "
            "weighting raster",
            stacklevel=2,
        )

    zset = parse_zone_table(zones)
    zones_ref = ray.put(zset)
    store_values = bool(STORED_VALUE_STATS & set(stats))
    vgd, wgd = vg.to_dict(), wg.to_dict()
    th, tw = value_raster.tile_h, value_raster.tile_w

    w_frags = weight_raster.ds.filter(
        expr=f"layer == '{weight_layer}'"
    ).map_batches(
        cached_stage(WeightFanout, zones_ref, vgd, wgd, th, tw),
        batch_format="pyarrow",
    )
    v_rows = value_raster.ds.map_batches(
        cached_stage(ValueFanout, zones_ref, vgd, wgd, th, tw, value_layer),
        batch_format="pyarrow",
    )
    group_fn = cached_stage(
        MixedGroupStats, zones_ref, vgd, wgd, th, tw, store_values
    )
    partials = (
        v_rows.union(w_frags)
        .groupby("tile_id")
        .map_groups(group_fn, batch_format="pyarrow")
    )
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    partials = partials.materialize().repartition(ncpu)
    quantiles = quantiles or [0.5]

    def finalize(group: pd.DataFrame) -> pd.DataFrame:
        merged = merge_partial_group(group, store_values)
        out = {"zone_id": [int(group["zone_id"].iloc[0])]}
        for s in stats:
            if s == "quantile":
                for q in quantiles:
                    out[f"q{int(100*q):02d}"] = [merged.quantile(q)]
            else:
                out[s] = [merged.result(s)]
        return pd.DataFrame(out)

    res = partials.groupby("zone_id").map_groups(finalize, batch_format="pandas")
    from .zonal import pad_missing_zones

    df = pad_missing_zones(res.to_pandas(), stats, quantiles, zset.zone_ids)
    seq = {int(z): int(s) for z, s in zip(zset.zone_ids, zset.zone_seq)}
    df["__seq"] = df["zone_id"].map(seq)
    df = df.sort_values("__seq").drop(columns="__seq").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)
