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

Ray shape: streams over VALUE tiles; the weight raster is materialized once
on the driver and broadcast via ``ray.put`` (weight rasters are typically the
small side; the scale path for two huge rasters is a tile-aligned zip of
co-partitioned tile Datasets — same stage body, different tile source).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

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


def materialize_raster(rd, layer: str = "value") -> np.ndarray:
    """Collect a (small) tile Dataset into one dense array (driver side)."""
    arr = np.full((rd.grid.nrow, rd.grid.ncol), np.nan)
    for row in rd.ds.filter(expr=f"layer == '{layer}'").iter_rows():
        th, tw = int(row["th"]), int(row["tw"])
        r0, c0 = int(row["row0"]), int(row["col0"])
        arr[r0 : r0 + th, c0 : c0 + tw] = np.asarray(
            row["values"], dtype=np.float64
        ).reshape(th, tw)
    return arr


class MixedResPartialStats:
    """Streams value tiles; weight raster broadcast; stats on the common grid."""

    def __init__(
        self,
        zones_ref,
        weight_ref,
        value_grid: dict,
        weight_grid: dict,
        store_values: bool,
        value_layer: str,
    ):
        self.zones = ray.get(zones_ref)
        self.weights = ray.get(weight_ref)
        self.vg = Grid.from_dict(value_grid)
        self.wg = Grid.from_dict(weight_grid)
        self.store_values = store_values
        self.value_layer = value_layer
        # common grid factor: how many common cells per value/weight cell
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

    def __call__(self, batch: pa.Table) -> pa.Table:
        layers = batch.column("layer").to_pylist()
        tile_ids = batch.column("tile_id").to_numpy()
        row0s = batch.column("row0").to_numpy()
        col0s = batch.column("col0").to_numpy()
        ths = batch.column("th").to_numpy()
        tws = batch.column("tw").to_numpy()
        values_col = batch.column("values")

        out_rows: list[dict] = []
        for i, lay in enumerate(layers):
            if lay != self.value_layer:
                continue
            row0, col0, th, tw = int(row0s[i]), int(col0s[i]), int(ths[i]), int(tws[i])
            # this tile's window on the COMMON grid
            crow0, ccol0 = row0 * self.fv_y, col0 * self.fv_x
            cth, ctw = th * self.fv_y, tw * self.fv_x
            tile_grid = self.common.subgrid(crow0, ccol0, cth, ctw)
            zidx = self.zones.intersecting(tile_grid.extent)
            if len(zidx) == 0:
                continue
            vals = np.asarray(values_col[i].values, dtype=np.float64).reshape(th, tw)
            vals_c = np.repeat(np.repeat(vals, self.fv_y, axis=0), self.fv_x, axis=1)
            # weight window on the common grid via integer index mapping,
            # honoring an offset weight origin; cells OUTSIDE the weight
            # raster's extent are NODATA (NaN), which poisons weighted sums
            # exactly like the reference's raster get() outside-extent
            # behavior (test_exact_extract.R:626-641) — never edge-clamped
            wr = (crow0 + np.arange(cth) + self.off_y) // self.fw_y
            wc = (ccol0 + np.arange(ctw) + self.off_x) // self.fw_x
            vr = (wr >= 0) & (wr < self.weights.shape[0])
            vc = (wc >= 0) & (wc < self.weights.shape[1])
            w_c = np.full((cth, ctw), np.nan)
            if vr.any() and vc.any():
                w_c[np.ix_(vr, vc)] = self.weights[np.ix_(wr[vr], wc[vc])]

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
                row["tile_id"] = int(tile_ids[i])
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
    grids. Mirrors exact_extract(..., weights=<other-res raster>)."""
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
    warr = materialize_raster(weight_raster, weight_layer)
    weight_ref = ray.put(warr)
    store_values = bool(STORED_VALUE_STATS & set(stats))

    partials = value_raster.ds.map_batches(
        cached_stage(
            MixedResPartialStats,
            zones_ref,
            weight_ref,
            vg.to_dict(),
            wg.to_dict(),
            store_values,
            value_layer,
        ),
        batch_format="pyarrow",
        batch_size=None,
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
