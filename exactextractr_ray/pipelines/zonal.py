"""exact_extract on Ray Data: zonal statistics of polygon zones over a tiled
raster Dataset.

Physical plan (the Ray-native re-expression of the reference's
RasterSequentialProcessor, /root/reference/src/exactextract/src/
raster_sequential_processor.cpp:38-121 — "partition by raster subgrid,
broadcast the feature set, merge partial stats per feature"):

1. zones (small side) are parsed once on the driver and broadcast with
   ``ray.put`` — every map task reads the same object-store copy, nothing is
   re-shipped per batch;
2. ``tiles.map_batches(ZonalPartialStats)`` — for each tile, envelope-probe
   the broadcast zones, compute exact coverage on the (tile ∩ zone-envelope)
   subgrid with the vectorized kernel, and emit ONE partial-stats row per
   (zone, tile): the wide data (cell values) never leaves the task, only
   ~200-byte aggregation states shuffle. A zone spanning 10^6 tiles is
   naturally decomposed into 10^6 independent work items (the skew story of
   SURVEY.md §4.3);
3. ``groupby("zone_id")`` over partial rows + per-group merge in sorted
   tile_id order (deterministic at any parallelism), then finalize into stat
   columns;
4. zones that touched nothing get NaN rows, and the output is ordered by
   input zone order (zone_seq), matching the reference's ordering contract
   (/root/reference/R/exact_extract.R:87-89).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from ..grid import Box, Grid
from ..sources.zones import ZoneSet, parse_zone_table
from ..stats import PARTIAL_COLUMNS, STORED_VALUE_STATS, RasterStats
from ..coverage import coverage_matrix
from ..util import cached_stage


def _quantile_colname(q: float) -> str:
    """q=0.25 -> 'q25', mirroring .quantileColNames
    (/root/reference/R/exact_extract_helpers.R:39-49)."""
    pct = 100 * q
    if abs(pct - round(pct)) < 1e-9:
        return f"q{int(round(pct)):02d}"
    return ("q%s" % pct).replace(".", "_")


def expand_stat_columns(stats: list[str], quantiles: list[float] | None) -> list[str]:
    cols: list[str] = []
    for s in stats:
        if s == "quantile":
            cols.extend(_quantile_colname(q) for q in (quantiles or [0.5]))
        else:
            cols.append(s)
    return cols


class ZonalPartialStats:
    """Actor-pool map_batches stage: tile batches -> partial-stats rows.

    Stateful setup (zone parse + per-zone edge bounding boxes) happens once
    per actor in __init__; __call__ only does vectorized per-tile work.

    Fast path — the tile-granular analog of the reference's FloodFill
    (/root/reference/src/exactextract/src/floodfill.h:62-131): a tile that no
    zone-boundary edge crosses is uniformly inside (coverage 1 everywhere) or
    uniformly outside (skip) a zone, decided by one point-in-polygon test of
    the tile center. Uniform-inside tiles reuse ONE cached full-tile stat per
    tile instead of an O(cells) pass per (zone, tile) pair — for large zones
    this removes almost all interior work, exactly like the reference's
    traversal touching only boundary cells.
    """

    def __init__(
        self,
        zones_ref,
        grid_dict: dict,
        store_values: bool,
        value_layer: str = "value",
        weight_layer: str | None = None,
    ):
        zones = ray.get(zones_ref) if not isinstance(zones_ref, ZoneSet) else zones_ref
        self.zones = zones
        self.grid = Grid.from_dict(grid_dict)
        self.store_values = store_values
        self.value_layer = value_layer
        self.weight_layer = weight_layer
        # per-zone edge bounding boxes for the boundary-crossing test
        self._edge_bboxes: list[np.ndarray] = []
        for parts in zones.parts:
            boxes = []
            for part in parts:
                rings = part["rings"] if part["type"] == "Polygon" else [part["coords"]]
                for ring in rings:
                    x0, y0 = ring[:-1, 0], ring[:-1, 1]
                    x1, y1 = ring[1:, 0], ring[1:, 1]
                    boxes.append(
                        np.column_stack(
                            [
                                np.minimum(x0, x1),
                                np.minimum(y0, y1),
                                np.maximum(x0, x1),
                                np.maximum(y0, y1),
                            ]
                        )
                    )
            self._edge_bboxes.append(
                np.vstack(boxes) if boxes else np.empty((0, 4))
            )

    def _classify(self, zi: int, box: Box) -> int:
        """-1 if any ring edge bbox overlaps the tile box (boundary tile),
        else the uniform winding number (0 = outside, k>=1 = covered k times
        — k>1 for self-overlapping multipolygons)."""
        eb = self._edge_bboxes[zi]
        if len(eb):
            hit = (
                (eb[:, 0] < box.xmax)
                & (eb[:, 2] > box.xmin)
                & (eb[:, 1] < box.ymax)
                & (eb[:, 3] > box.ymin)
            )
            if hit.any():
                return -1
        from ..stages.pip_join import winding_number

        cx = np.array([(box.xmin + box.xmax) * 0.5])
        cy = np.array([(box.ymin + box.ymax) * 0.5])
        return int(winding_number(cx, cy, self.zones.parts[zi])[0])

    def __call__(self, batch: pa.Table) -> pa.Table:
        layers = batch.column("layer").to_pylist()
        tile_ids = batch.column("tile_id").to_numpy()
        row0s = batch.column("row0").to_numpy()
        col0s = batch.column("col0").to_numpy()
        ths = batch.column("th").to_numpy()
        tws = batch.column("tw").to_numpy()
        values_col = batch.column("values")

        # locate the weight row for each tile in this batch (if weighted)
        weight_rows: dict[int, int] = {}
        if self.weight_layer is not None:
            for i, lay in enumerate(layers):
                if lay == self.weight_layer:
                    weight_rows[int(tile_ids[i])] = i

        out_rows: list[dict] = []
        for i, lay in enumerate(layers):
            if lay != self.value_layer:
                continue
            tid = int(tile_ids[i])
            row0, col0, th, tw = int(row0s[i]), int(col0s[i]), int(ths[i]), int(tws[i])
            tile_grid = self.grid.subgrid(row0, col0, th, tw)
            zidx = self.zones.intersecting(tile_grid.extent)
            if len(zidx) == 0:
                continue
            vals = None
            wvals = None
            full_tile_row = None  # cached full-coverage stats for this tile

            def load_values():
                nonlocal vals, wvals
                if vals is None:
                    vals = np.asarray(
                        values_col[i].values, dtype=np.float64
                    ).reshape(th, tw)
                    if self.weight_layer is not None:
                        wi = weight_rows.get(tid)
                        if wi is None:
                            raise ValueError(
                                f"weight layer {self.weight_layer!r} for tile "
                                f"{tid} not in the same block as its value layer"
                            )
                        wvals = np.asarray(
                            values_col[wi].values, dtype=np.float64
                        ).reshape(th, tw)

            for zi in zidx:
                e = self.zones.envelopes[zi]
                zbox = Box(e[0], e[1], e[2], e[3])
                kind = (
                    -1
                    if not zbox.contains(tile_grid.extent)
                    else self._classify(zi, tile_grid.extent)
                )
                if kind == 0:
                    continue
                load_values()
                if kind >= 1:
                    if full_tile_row is None:
                        st = RasterStats(store_values=self.store_values)
                        st.process(vals, np.ones((th, tw)), wvals)
                        full_tile_row = st.to_row()
                    if kind == 1:
                        row = dict(full_tile_row)
                    else:
                        st = RasterStats(store_values=self.store_values)
                        st.process(vals, np.full((th, tw), float(kind)), wvals)
                        row = st.to_row()
                else:
                    sub = tile_grid.crop_to_box(zbox)
                    if sub.empty():
                        continue
                    cov = coverage_matrix(sub, self.zones.parts[zi])
                    if not np.any(cov):
                        continue
                    r0 = sub.row_offset(tile_grid)
                    c0 = sub.col_offset(tile_grid)
                    vs = vals[r0 : r0 + sub.nrow, c0 : c0 + sub.ncol]
                    ws = (
                        wvals[r0 : r0 + sub.nrow, c0 : c0 + sub.ncol]
                        if wvals is not None
                        else None
                    )
                    st = RasterStats(store_values=self.store_values)
                    st.process(vs, cov, ws)
                    row = st.to_row()
                row["zone_id"] = int(self.zones.zone_ids[zi])
                row["tile_id"] = tid
                out_rows.append(row)

        if not out_rows:
            return _empty_partial_table()
        return pa.Table.from_pylist(out_rows, schema=_partial_schema())


def _partial_schema() -> pa.Schema:
    fields = [("zone_id", pa.int64()), ("tile_id", pa.int64())]
    for c in PARTIAL_COLUMNS:
        if c.startswith("freq_"):
            fields.append((c, pa.list_(pa.float64())))
        else:
            fields.append((c, pa.float64()))
    return pa.schema(fields)


def _empty_partial_table() -> pa.Table:
    return pa.Table.from_pylist([], schema=_partial_schema())


def merge_partial_group(df: pd.DataFrame, store_values: bool) -> RasterStats:
    """Merge one zone's partial rows in sorted tile order (determinism)."""
    df = df.sort_values("tile_id", kind="mergesort")
    merged = RasterStats(store_values=store_values)
    for row in df.to_dict("records"):
        merged.merge(RasterStats.from_row(row, store_values=store_values))
    return merged


def exact_extract(
    raster,
    zones: pa.Table,
    stats: list[str],
    value_layer: str = "value",
    weight_layer: str | None = None,
    quantiles: list[float] | None = None,
    include_cols: list[str] | None = None,
    concurrency: int | None = None,
    actors: bool = False,
) -> pa.Table:
    """Named-stats zonal statistics; returns one row per zone in input order.

    ``raster``: a sources.raster.RasterDataset. ``zones``: Arrow table with
    zone_id / geom_wkb (+ zone_seq, extra attribute columns). ``stats``: any
    of stats.ALL_STATS; 'quantile' expands via ``quantiles``; 'frac' /
    'weighted_frac' expand into one column per observed value across all
    zones with 0.0 defaults (/root/reference/R/exact_extract.R:533-569).
    """
    zset = parse_zone_table(zones)
    zones_ref = ray.put(zset)
    store_values = bool(STORED_VALUE_STATS & set(stats))

    stage_args = (
        zones_ref,
        raster.grid.to_dict(),
        store_values,
        value_layer,
        weight_layer,
    )
    if actors:
        partials = raster.ds.map_batches(
            ZonalPartialStats,
            fn_constructor_args=stage_args,
            batch_format="pyarrow",
            batch_size=None,
            concurrency=concurrency or (1, 8),
        )
    else:
        # cached-task mode: instance built once per worker process (util.py)
        partials = raster.ds.map_batches(
            cached_stage(ZonalPartialStats, *stage_args),
            batch_format="pyarrow",
            batch_size=None,
        )

    # Materialize the partial-stats rows, then coalesce before the groupby.
    # Both are safe by design — partials are ~200-byte aggregation states,
    # orders of magnitude smaller than the tile stream — and both matter:
    # materializing detaches the map stage from the all-to-all (the streaming
    # executor throttles map tasks feeding a pending shuffle: 3.4x slower
    # measured), and coalescing to a CPU-count of blocks keeps the sort
    # shuffle out of the tiny-object regime.
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    partials = partials.materialize().repartition(ncpu)

    quantiles = quantiles or [0.5]

    def finalize(group: pd.DataFrame) -> pd.DataFrame:
        merged = merge_partial_group(group, store_values)
        out = {"zone_id": [int(group["zone_id"].iloc[0])]}
        for s in stats:
            if s == "quantile":
                for q in quantiles:
                    out[_quantile_colname(q)] = [merged.quantile(q)]
            elif s in ("frac", "weighted_frac"):
                d = merged.result(s)
                out[f"__{s}_values"] = [list(d.keys())]
                out[f"__{s}_shares"] = [list(d.values())]
            else:
                out[s] = [merged.result(s)]
        return pd.DataFrame(out)

    agg = partials.groupby("zone_id").map_groups(finalize, batch_format="pandas")
    result = agg.to_pandas()  # one row per zone: small by design

    # zones with no coverage -> NaN rows (ref: test_exact_extract.R:433-485)
    have = set(result["zone_id"]) if len(result) else set()
    missing = [int(z) for z in zset.zone_ids if int(z) not in have]
    if missing:
        pad = {"zone_id": missing}
        for col in result.columns:
            if col == "zone_id":
                continue
            if col.startswith("__"):
                pad[col] = [[] for _ in missing]
            else:
                pad[col] = [
                    0.0 if col in ("count", "sum", "weighted_sum", "variety") else math.nan
                ] * len(missing)
        result = pd.concat([result, pd.DataFrame(pad)], ignore_index=True)

    # frac/weighted_frac: union observed values across zones -> wide columns
    for s in ("frac", "weighted_frac"):
        vcol, scol = f"__{s}_values", f"__{s}_shares"
        if vcol in result.columns:
            all_vals = sorted({v for lst in result[vcol] for v in lst})
            for v in all_vals:
                name = f"{s}_{int(v) if float(v).is_integer() else v}"
                result[name] = [
                    dict(zip(vl, sl)).get(v, 0.0)
                    for vl, sl in zip(result[vcol], result[scol])
                ]
            result = result.drop(columns=[vcol, scol])

    # restore input order + attach attribute columns (include_cols analog)
    seq = {int(z): int(s) for z, s in zip(zset.zone_ids, zset.zone_seq)}
    result["__seq"] = result["zone_id"].map(seq)
    result = result.sort_values("__seq").drop(columns="__seq").reset_index(drop=True)
    if include_cols:
        zdf = zones.select(["zone_id"] + include_cols).to_pandas()
        result = result.merge(zdf, on="zone_id", how="left")
        result = result[
            ["zone_id"] + include_cols
            + [c for c in result.columns if c not in ("zone_id", *include_cols)]
        ]
    return pa.Table.from_pandas(result, preserve_index=False)


class ZonalCellExtract:
    """map_batches stage: tile batches -> per-cell extraction rows
    (the reference's fun=NULL path, /root/reference/src/exact_extract.cpp:46-237:
    one row per covered cell with value / coverage / optional x, y, cell)."""

    def __init__(
        self,
        zones_ref,
        grid_dict: dict,
        value_layer: str,
        weight_layer: str | None,
        include_xy: bool,
        include_cell: bool,
    ):
        zones = ray.get(zones_ref) if not isinstance(zones_ref, ZoneSet) else zones_ref
        self.zones = zones
        self.grid = Grid.from_dict(grid_dict)
        self.value_layer = value_layer
        self.weight_layer = weight_layer
        self.include_xy = include_xy
        self.include_cell = include_cell

    def __call__(self, batch: pa.Table) -> pa.Table:
        layers = batch.column("layer").to_pylist()
        tile_ids = batch.column("tile_id").to_numpy()
        row0s = batch.column("row0").to_numpy()
        col0s = batch.column("col0").to_numpy()
        ths = batch.column("th").to_numpy()
        tws = batch.column("tw").to_numpy()
        values_col = batch.column("values")

        weight_rows: dict[int, int] = {}
        if self.weight_layer is not None:
            for i, lay in enumerate(layers):
                if lay == self.weight_layer:
                    weight_rows[int(tile_ids[i])] = i

        chunks: list[dict] = []
        for i, lay in enumerate(layers):
            if lay != self.value_layer:
                continue
            tid = int(tile_ids[i])
            row0, col0, th, tw = int(row0s[i]), int(col0s[i]), int(ths[i]), int(tws[i])
            tile_grid = self.grid.subgrid(row0, col0, th, tw)
            zidx = self.zones.intersecting(tile_grid.extent)
            if len(zidx) == 0:
                continue
            vals = np.asarray(values_col[i].values, dtype=np.float64).reshape(th, tw)
            wvals = None
            if self.weight_layer is not None:
                wi = weight_rows.get(tid)
                if wi is not None:
                    wvals = np.asarray(values_col[wi].values, dtype=np.float64).reshape(
                        th, tw
                    )
            for zi in zidx:
                cov = coverage_matrix(tile_grid, self.zones.parts[zi])
                rr, cc = np.nonzero(cov > 0.0)
                if len(rr) == 0:
                    continue
                chunk = {
                    "zone_id": np.full(len(rr), self.zones.zone_ids[zi], dtype=np.int64),
                    "value": vals[rr, cc],
                    "cov": cov[rr, cc],
                }
                if wvals is not None:
                    chunk["weight"] = wvals[rr, cc]
                g_rows = rr + row0
                g_cols = cc + col0
                if self.include_xy:
                    chunk["x"] = self.grid.x_for_col(g_cols)
                    chunk["y"] = self.grid.y_for_row(g_rows)
                if self.include_cell:
                    chunk["cell"] = self.grid.cell_numbers(g_rows, g_cols)
                chunks.append(chunk)

        if not chunks:
            cols = {"zone_id": pa.array([], pa.int64()),
                    "value": pa.array([], pa.float64()),
                    "cov": pa.array([], pa.float64())}
            if self.weight_layer is not None:
                cols["weight"] = pa.array([], pa.float64())
            if self.include_xy:
                cols["x"] = pa.array([], pa.float64())
                cols["y"] = pa.array([], pa.float64())
            if self.include_cell:
                cols["cell"] = pa.array([], pa.int64())
            return pa.table(cols)
        merged = {
            k: np.concatenate([c[k] for c in chunks]) for k in chunks[0]
        }
        return pa.table(merged)


def extract_cells(
    raster,
    zones: pa.Table,
    value_layer: str = "value",
    weight_layer: str | None = None,
    include_xy: bool = False,
    include_cell: bool = False,
    concurrency=None,
):
    """Per-cell extraction Dataset: one row per (zone, covered cell).

    Streams — suitable for feeding user aggregations via
    ``.groupby("zone_id").map_groups(user_fn)`` (the R UDF path analog,
    /root/reference/R/exact_extract.R:608-765)."""
    zset = parse_zone_table(zones)
    zones_ref = ray.put(zset)
    return raster.ds.map_batches(
        cached_stage(
            ZonalCellExtract,
            zones_ref,
            raster.grid.to_dict(),
            value_layer,
            weight_layer,
            include_xy,
            include_cell,
        ),
        batch_format="pyarrow",
        batch_size=None,
    )
