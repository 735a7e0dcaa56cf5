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
   (zone, tile, layer-pair): the wide data (cell values) never leaves the
   task, only ~250-byte aggregation states shuffle. A zone spanning 10^6
   tiles is naturally decomposed into 10^6 independent work items (the skew
   story of SURVEY.md §4.3). Tiles that no zone-boundary edge crosses are
   uniformly covered and reuse one cached full-tile stat (the tile-granular
   analog of the reference's FloodFill, floodfill.h:62-131);
3. ``groupby("zone_id")`` over partial rows + per-group merge in sorted
   tile_id order (deterministic at any parallelism), then finalize into stat
   columns named by the reference's rules
   (/root/reference/R/exact_extract_helpers.R:28-152: layer recycling,
   ``{stat}.{value_layer}.{weight_layer}`` suffixing, q%02d, frac_{v});
4. zones that touched nothing get NaN rows, and the output is ordered by
   input zone order (zone_seq), matching the reference's ordering contract
   (/root/reference/R/exact_extract.R:87-89).

Multi-layer semantics: value × weight stacks recycle pairwise (n×n, 1×n,
n×1; n×m rejected) exactly as .valueWeightIndexes
(/root/reference/R/exact_extract_helpers.R:133-152). ``weights='area'``
builds a per-cell area raster (constant for 'cartesian', per-latitude-band
spherical for 'spherical' with R=6378137 — raster_area.h:21-69);
``coverage_area=True`` multiplies coverage fractions by cell area.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from ..grid import Box, Grid
from ..sources.zones import ZoneSet, parse_zone_table
from ..stages.pip_join import winding_number
from ..stats import (
    INT_NODATA,
    PARTIAL_COLUMNS,
    STORED_VALUE_STATS,
    RasterStats,
    VarState,
)
from ..coverage import coverage_matrix, length_matrix
from ..util import cached_stage


def zone_coverage(sub: Grid, parts: list[dict]) -> np.ndarray:
    """Coverage matrix for a zone's parts: exact area fractions for polygons,
    per-cell traversal lengths for linestrings. Mixed areal/linear
    collections are rejected like the reference
    (/root/reference/src/exactextract/src/raster_cell_intersection.cpp:250-259)."""
    has_poly = any(p["type"] == "Polygon" for p in parts)
    has_line = any(p["type"] == "LineString" for p in parts)
    if has_poly and has_line:
        raise ValueError(
            "geometry collections mixing areal and linear parts are not supported"
        )
    if has_line:
        return length_matrix(sub, parts)
    return coverage_matrix(sub, parts)

EARTH_RADIUS = 6378137.0
_PI_180 = math.pi / 180.0

#: cap on the dense working-set of one (zone, tile) boundary work item —
#: the reference's max_cells_in_memory analog (R/exact_extract.R:286
#: default 3e7; ours is per-item, tiles bound the common case already)
MAX_CELLS_PER_ITEM = 1 << 22  # 4M cells = 32 MiB float64

WEIGHTED_STATS = {
    "weighted_mean",
    "weighted_sum",
    "weighted_frac",
    "weighted_stdev",
    "weighted_variance",
    "weighted_count",
    "weighted_fraction",
}


def spherical_band_areas(grid: Grid, row0: int, nrows: int) -> np.ndarray:
    """Per-row spherical cell areas (m^2), R=6378137 — the reference's
    SphericalAreaRaster (/root/reference/src/exactextract/src/raster_area.h:38-69)."""
    rows = np.arange(row0, row0 + nrows)
    y = grid.ymax - (rows + 0.5) * grid.dy
    ymin = y - 0.5 * grid.dy
    ymax = y + 0.5 * grid.dy
    return (
        EARTH_RADIUS
        * EARTH_RADIUS
        * _PI_180
        * np.abs(np.sin(ymin * _PI_180) - np.sin(ymax * _PI_180))
        * grid.dx
    )


def cell_area_matrix(grid: Grid, row0: int, nrows: int, ncols: int, method: str) -> np.ndarray:
    if method == "spherical":
        return np.broadcast_to(
            spherical_band_areas(grid, row0, nrows)[:, None], (nrows, ncols)
        )
    return np.full((nrows, ncols), grid.dx * grid.dy)


def _prune_tiles_to_zones(raster, zset: ZoneSet):
    """Expression-filter the tile Dataset to the zones' union envelope:
    only (row0, col0) ranges that can intersect ANY zone stream onward.
    Returns raster.ds unchanged when the zones cover the whole grid."""
    g = raster.grid
    e = zset.envelopes
    if len(e) == 0:
        return raster.ds.filter(expr="row0 < 0")  # nothing can match
    xmin = float(e[:, 0].min())
    ymin = float(e[:, 1].min())
    xmax = float(e[:, 2].max())
    ymax = float(e[:, 3].max())
    if (
        xmin <= g.xmin and ymin <= g.ymin
        and xmax >= g.xmax and ymax >= g.ymax
    ):
        return raster.ds
    # grid rows count from the top (y = ymax at row 0)
    rmin = int(np.floor((g.ymax - ymax) / g.dy))
    rmax = int(np.ceil((g.ymax - ymin) / g.dy)) - 1
    cmin = int(np.floor((xmin - g.xmin) / g.dx))
    cmax = int(np.ceil((xmax - g.xmin) / g.dx)) - 1
    if rmax < 0 or cmax < 0 or rmin >= g.nrow or cmin >= g.ncol:
        return raster.ds.filter(expr="row0 < 0")
    # a tile [row0, row0+tile_h) overlaps [rmin, rmax] iff
    # row0 <= rmax and row0 > rmin - tile_h (row0 is a tile_h multiple)
    return raster.ds.filter(
        expr=(
            f"row0 <= {max(rmax, 0)} and row0 > {rmin - raster.tile_h} and "
            f"col0 <= {max(cmax, 0)} and col0 > {cmin - raster.tile_w}"
        )
    )


def value_weight_indexes(num_values: int, num_weights: int):
    """Layer recycling (.valueWeightIndexes, exact_extract_helpers.R:133-152)."""
    if num_weights == 0:
        return list(range(num_values)), [None] * num_values
    if num_values == num_weights:
        return list(range(num_values)), list(range(num_weights))
    if num_values == 1 and num_weights > 1:
        return [0] * num_weights, list(range(num_weights))
    if num_values > 1 and num_weights == 1:
        return list(range(num_values)), [0] * num_values
    raise ValueError(
        "value and weight layer counts must be n/n, 1/n, or n/1 "
        f"(got {num_values}/{num_weights})"
    )


def _quantile_part(q: float) -> str:
    """sprintf('q%02d', as.integer(100*q)) — truncation, not rounding
    (exact_extract_helpers.R:99)."""
    return f"q{int(100 * q):02d}"


def _frac_part(stat: str, v: float) -> str:
    sv = str(int(v)) if float(v).is_integer() else str(v)
    return f"{stat}_{sv}"


def make_colname(
    stat: str,
    value_name: str,
    weight_name: str | None,
    fun_value,
    full_colnames: bool,
    nvalues: int,
    nweights: int,
) -> str:
    """.makeColname (exact_extract_helpers.R:95-115)."""
    if stat == "quantile":
        ret = _quantile_part(fun_value)
    elif stat in ("frac", "weighted_frac"):
        ret = _frac_part(stat, fun_value)
    else:
        ret = stat
    if full_colnames or nvalues > 1:
        ret = f"{ret}.{value_name}"
    include_weight = stat in WEIGHTED_STATS or stat == "fun"
    if weight_name is not None and include_weight and (
        (full_colnames and nweights > 0) or nweights > 1
    ):
        ret = f"{ret}.{weight_name}"
    return ret


class ZonalPartialStats:
    """map_batches stage: tile batches -> partial-stats rows, one per
    (zone, tile, value/weight layer pair)."""

    def __init__(
        self,
        zones_ref,
        grid_dict: dict,
        store_values: bool,
        pairs: list[tuple[str, str | None]],
        coverage_area: bool = False,
        area_method: str = "cartesian",
        default_value: float | None = None,
        default_weight: float | None = None,
        need_minmax: bool = True,
        max_cells_per_item: int | None = None,
    ):
        zones = ray.get(zones_ref) if not isinstance(zones_ref, ZoneSet) else zones_ref
        self.zones = zones
        self.grid = Grid.from_dict(grid_dict)
        self.store_values = store_values
        self.pairs = pairs
        self.coverage_area = coverage_area
        self.area_method = area_method
        self.default_value = default_value
        self.default_weight = default_weight
        self.need_minmax = need_minmax
        self.max_cells_per_item = max_cells_per_item or MAX_CELLS_PER_ITEM
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
            self._edge_bboxes.append(np.vstack(boxes) if boxes else np.empty((0, 4)))

    def _classify(self, zi: int, box: Box) -> int:
        """-1 = boundary tile; else the uniform winding number (0 outside,
        k >= 1 covered k times — k > 1 for self-overlapping multipolygons)."""
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
        cx = np.array([(box.xmin + box.xmax) * 0.5])
        cy = np.array([(box.ymin + box.ymax) * 0.5])
        return int(winding_number(cx, cy, self.zones.parts[zi])[0])

    def _fill(self, arr: np.ndarray, default: float | None) -> np.ndarray:
        """default_value/default_weight NA substitution
        (/root/reference/src/s4_raster_source.h:84-90)."""
        if default is None:
            return arr
        out = arr.copy()
        out[np.isnan(out)] = default
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        layers = batch.column("layer").to_pylist()
        tile_ids = batch.column("tile_id").to_numpy()
        row0s = batch.column("row0").to_numpy()
        col0s = batch.column("col0").to_numpy()
        ths = batch.column("th").to_numpy()
        tws = batch.column("tw").to_numpy()
        values_col = batch.column("values")

        # row index per (tile, layer) in this batch
        layer_rows: dict[tuple[int, str], int] = {
            (int(tile_ids[i]), lay): i for i, lay in enumerate(layers)
        }
        needed_layers = {p[0] for p in self.pairs} | {
            p[1] for p in self.pairs if p[1] not in (None, "area")
        }
        seen_tiles: list[int] = []
        seen = set()
        for i, lay in enumerate(layers):
            t = int(tile_ids[i])
            if t not in seen:
                seen.add(t)
                seen_tiles.append(t)

        out = _PartialBuilder()
        for tid in seen_tiles:
            i0 = layer_rows.get((tid, self.pairs[0][0]))
            if i0 is None:
                continue
            row0, col0, th, tw = (
                int(row0s[i0]),
                int(col0s[i0]),
                int(ths[i0]),
                int(tws[i0]),
            )
            tile_grid = self.grid.subgrid(row0, col0, th, tw)
            zidx = self.zones.intersecting(tile_grid.extent)
            if len(zidx) == 0:
                continue

            loaded: dict[str, np.ndarray] = {}
            loaded64: dict[str, np.ndarray] = {}

            def get_layer(name: str) -> np.ndarray:
                """Tile layer in its STORED dtype (int16 tiles stay int16:
                the DRAM lever — the interior unit-coverage path feeds the
                2 B/cell array straight to RasterStats' exact int64
                accumulators and never expands it to 8 B/cell)."""
                arr = loaded.get(name)
                if arr is None:
                    if name == "area":
                        arr = np.asarray(
                            cell_area_matrix(
                                self.grid, row0, th, tw, self.area_method
                            )
                        )
                    else:
                        ri = layer_rows.get((tid, name))
                        if ri is None:
                            raise ValueError(
                                f"layer {name!r} for tile {tid} not in the "
                                "same block as its value layer"
                            )
                        arr = np.asarray(values_col[ri].values).reshape(
                            th, tw
                        )
                    loaded[name] = arr
                return arr

            def get_layer_f64(name: str) -> np.ndarray:
                """float64 view of the layer with integer NODATA sentinel
                mapped to NaN — built once per tile and cached (boundary /
                scaled-coverage paths; interior tiles never pay this)."""
                arr = loaded64.get(name)
                if arr is None:
                    raw = get_layer(name)
                    if raw.dtype.kind in "iu":
                        arr = raw.astype(np.float64)
                        arr[raw == INT_NODATA] = np.nan
                    elif raw.dtype != np.float64:
                        arr = raw.astype(np.float64)
                    else:
                        arr = raw
                    loaded64[name] = arr
                return arr

            cov_scale = None
            if self.coverage_area:
                cov_scale = cell_area_matrix(
                    self.grid, row0, th, tw, self.area_method
                )

            full_tile_rows: dict[int, dict] = {}  # pair_idx -> cached row
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
                if kind >= 1:
                    # kind == 1 with no area scaling: unit-coverage fast path
                    # (process(cov=None)) — no coverage array built or scanned
                    unit_cov = kind == 1 and cov_scale is None
                    cov_full = None
                    for pi, (vlay, wlay) in enumerate(self.pairs):
                        if kind == 1 and pi in full_tile_rows:
                            row = full_tile_rows[pi]  # append() never mutates
                        else:
                            if not unit_cov and cov_full is None:
                                cov_full = np.full((th, tw), float(kind))
                                if cov_scale is not None:
                                    cov_full = cov_full * cov_scale
                            if unit_cov and self.default_value is None \
                                    and self.default_weight is None:
                                # stored-dtype fast path: RasterStats
                                # handles int16 sentinel / float32 natively
                                vals = get_layer(vlay)
                                ws = (
                                    get_layer(wlay)
                                    if wlay is not None
                                    else None
                                )
                            else:
                                vals = self._fill(
                                    get_layer_f64(vlay), self.default_value
                                )
                                ws = (
                                    self._fill(
                                        get_layer_f64(wlay),
                                        self.default_weight,
                                    )
                                    if wlay is not None
                                    else None
                                )
                            st = RasterStats(store_values=self.store_values)
                            st.process(vals, cov_full, ws, need_minmax=self.need_minmax)
                            row = st.to_row()
                            if kind == 1:
                                full_tile_rows[pi] = row
                        out.append(row, int(self.zones.zone_ids[zi]), tid, 0, pi)
                else:
                    # recursive tile decomposition: a boundary work item whose
                    # crop exceeds MAX_CELLS_PER_ITEM splits into halves until
                    # bounded — the reference's subdivide(max_cells_in_memory)
                    # analog (grid.cpp:74-99), but the split pieces stay
                    # independent partial rows and recombine in the zone
                    # groupby like any other tile partials
                    stack = [tile_grid.crop_to_box(zbox)]
                    while stack:
                        sub = stack.pop()
                        if sub.empty():
                            continue
                        if sub.ncell > self.max_cells_per_item:
                            if sub.nrow >= sub.ncol:
                                half = sub.nrow // 2
                                stack.append(sub.subgrid(0, 0, half, sub.ncol))
                                stack.append(
                                    sub.subgrid(half, 0, sub.nrow - half, sub.ncol)
                                )
                            else:
                                half = sub.ncol // 2
                                stack.append(sub.subgrid(0, 0, sub.nrow, half))
                                stack.append(
                                    sub.subgrid(0, half, sub.nrow, sub.ncol - half)
                                )
                            continue
                        cov = zone_coverage(sub, self.zones.parts[zi])
                        if not np.any(cov):
                            continue
                        r0 = sub.row_offset(tile_grid)
                        c0 = sub.col_offset(tile_grid)
                        if cov_scale is not None:
                            cov = cov * cov_scale[
                                r0 : r0 + sub.nrow, c0 : c0 + sub.ncol
                            ]
                        for pi, (vlay, wlay) in enumerate(self.pairs):
                            vals = self._fill(
                                get_layer_f64(vlay), self.default_value
                            )[r0 : r0 + sub.nrow, c0 : c0 + sub.ncol]
                            ws = None
                            if wlay is not None:
                                ws = self._fill(
                                    get_layer_f64(wlay), self.default_weight
                                )[r0 : r0 + sub.nrow, c0 : c0 + sub.ncol]
                            st = RasterStats(store_values=self.store_values)
                            st.process(vals, cov, ws, need_minmax=self.need_minmax)
                            # piece: deterministic sub-tile merge order
                            out.append(
                                st.to_row(),
                                int(self.zones.zone_ids[zi]),
                                tid,
                                (r0 << 32) | c0,
                                pi,
                            )

        return out.to_table()


class _PartialBuilder:
    """Columnar partial-row accumulator: one Python list per column, one
    pa.array C pass per column at the end — replaces per-row dict building +
    from_pylist (partial rows dominate small-tile workloads)."""

    __slots__ = ("zone_id", "tile_id", "piece", "pair_idx", "stats")

    def __init__(self):
        self.zone_id: list[int] = []
        self.tile_id: list[int] = []
        self.piece: list[int] = []
        self.pair_idx: list[int] = []
        self.stats: dict[str, list] = {c: [] for c in PARTIAL_COLUMNS}

    def append(self, row: dict, zone_id: int, tile_id: int, piece: int, pair_idx: int):
        self.zone_id.append(zone_id)
        self.tile_id.append(tile_id)
        self.piece.append(piece)
        self.pair_idx.append(pair_idx)
        st = self.stats
        for c in PARTIAL_COLUMNS:
            st[c].append(row[c])

    def to_table(self) -> pa.Table:
        schema = _partial_schema()
        cols = {
            "zone_id": self.zone_id,
            "tile_id": self.tile_id,
            "piece": self.piece,
            "pair_idx": self.pair_idx,
            **self.stats,
        }
        return pa.Table.from_arrays(
            [pa.array(cols[f.name], type=f.type) for f in schema], schema=schema
        )


def _partial_schema() -> pa.Schema:
    fields = [
        ("zone_id", pa.int64()),
        ("tile_id", pa.int64()),
        ("piece", pa.int64()),
        ("pair_idx", pa.int32()),
    ]
    for c in PARTIAL_COLUMNS:
        if c.startswith("freq_"):
            fields.append((c, pa.list_(pa.float64())))
        else:
            fields.append((c, pa.float64()))
    return pa.schema(fields)


def _empty_partial_table() -> pa.Table:
    return pa.Table.from_pylist([], schema=_partial_schema())


def merge_partial_group(df: pd.DataFrame, store_values: bool) -> RasterStats:
    """Merge one zone's partial rows in sorted tile order (determinism).

    Vectorized: plain sums/min/max reduce as numpy columns; the West/Chan
    variance accumulators merge sequentially (order-dependent by nature) over
    the sorted rows; frequency maps concatenate and aggregate with one
    np.unique pass instead of per-row dict updates."""
    if "piece" in df.columns:
        df = df.sort_values(["tile_id", "piece"], kind="mergesort")
    else:
        df = df.sort_values("tile_id", kind="mergesort")
    merged = RasterStats(store_values=store_values)
    if len(df) == 0:
        return merged
    for col, attr in [
        ("sum_ci", "sum_ci"),
        ("sum_xici", "sum_xici"),
        ("sum_ciwi", "sum_ciwi"),
        ("sum_xiciwi", "sum_xiciwi"),
        ("sum_x2ci", "sum_x2ci"),
        ("sum_x2ciwi", "sum_x2ciwi"),
    ]:
        setattr(merged, attr, float(np.sum(df[col].to_numpy())))
    merged.min = float(np.min(df["vmin"].to_numpy()))
    merged.max = float(np.max(df["vmax"].to_numpy()))
    for w, mu, t in zip(
        df["var_w"].to_numpy(), df["var_mean"].to_numpy(), df["var_t"].to_numpy()
    ):
        merged.var.merge(VarState(float(w), float(mu), float(t)))
    for w, mu, t in zip(
        df["wvar_w"].to_numpy(), df["wvar_mean"].to_numpy(), df["wvar_t"].to_numpy()
    ):
        merged.wvar.merge(VarState(float(w), float(mu), float(t)))
    if store_values:
        vals_lists = [np.asarray(v, dtype=np.float64) for v in df["freq_values"]]
        if vals_lists:
            flat_v = np.concatenate(vals_lists) if vals_lists else np.empty(0)
            if len(flat_v):
                flat_c = np.concatenate(
                    [np.asarray(v, dtype=np.float64) for v in df["freq_ci"]]
                )
                flat_w = np.concatenate(
                    [np.asarray(v, dtype=np.float64) for v in df["freq_ciwi"]]
                )
                uq, inv = np.unique(flat_v, return_inverse=True)
                csum = np.bincount(inv, weights=flat_c, minlength=len(uq))
                wsum = np.bincount(inv, weights=flat_w, minlength=len(uq))
                merged.freq = {
                    v: [c, w]
                    for v, c, w in zip(uq.tolist(), csum.tolist(), wsum.tolist())
                }
    return merged


def exact_extract(
    raster,
    zones: pa.Table,
    stats: list[str],
    value_layer="value",
    weight_layer=None,
    quantiles: list[float] | None = None,
    include_cols: list[str] | None = None,
    coverage_area: bool = False,
    area_method: str = "cartesian",
    default_value: float | None = None,
    default_weight: float | None = None,
    full_colnames: bool = False,
    colname_fun=None,
    concurrency: int | None = None,
    actors: bool = False,
    materialize_partials: bool = True,
    max_cells_per_item: int | None = None,
    append_cols: list[str] | None = None,
    stats_sink: dict | None = None,
    return_partials: bool = False,
    partials_source=None,
) -> pa.Table:
    """Named-stats zonal statistics; one row per zone in input order.

    ``value_layer`` / ``weight_layer`` may be a single layer name or a list
    (stacks recycle pairwise); ``weight_layer='area'`` weights by cell area.
    'frac'/'weighted_frac' expand into one column per observed value across
    all zones with 0.0 defaults (/root/reference/R/exact_extract.R:533-569).
    ``append_cols`` is the reference's name for carrying feature attribute
    columns through to the per-zone result (R/exact_extract.R:219-224);
    it is the same operation as ``include_cols`` here.
    """
    if append_cols:
        include_cols = list(dict.fromkeys((include_cols or []) + append_cols))
    # reference contract: 'Invalid value of max_cells_in_memory'
    # (R/exact_extract.R max_cells validation, test_exact_extract_errors.R:241)
    if max_cells_per_item is not None:
        if not isinstance(max_cells_per_item, (int, np.integer)) or isinstance(
            max_cells_per_item, bool
        ):
            raise ValueError("max_cells_per_item must be a single integer")
        if max_cells_per_item <= 0:
            raise ValueError(f"Invalid max_cells_per_item: {max_cells_per_item}")
    # stats argument contract (test_exact_extract_errors.R:214-222, 473-494)
    if isinstance(stats, str):
        stats = [stats]
    if not stats:
        raise ValueError("No summary operations provided.")
    if not all(isinstance(s, str) for s in stats):
        raise ValueError(
            "summary operations must be a character vector, function, or "
            "list of functions"
        )
    # quantile contract (test_exact_extract_errors.R:338-354)
    if "quantile" in stats:
        if not quantiles:
            raise ValueError("Quantiles not specified")
        qarr = np.asarray(quantiles, dtype=float)
        if np.isnan(qarr).any() or (qarr < 0).any() or (qarr > 1).any():
            raise ValueError("Quantiles must be between 0 and 1")
    # scalar defaults (test_exact_extract_errors.R:495-520)
    for arg_name, arg in (
        ("default_value", default_value),
        ("default_weight", default_weight),
    ):
        if arg is not None and (
            isinstance(arg, bool) or not isinstance(arg, (int, float, np.number))
        ):
            raise ValueError(f"{arg_name} must be a single numeric value")
    value_names = [value_layer] if isinstance(value_layer, str) else list(value_layer)
    if weight_layer is None:
        weight_names: list[str] = []
    elif isinstance(weight_layer, str):
        weight_names = [weight_layer]
    else:
        weight_names = list(weight_layer)
    if any(s in WEIGHTED_STATS for s in stats) and not weight_names:
        raise ValueError("weighted stat requested but no weight layer given")
    if weight_names and not any(s in WEIGHTED_STATS for s in stats):
        # test_exact_extract_errors.R:28-37
        import warnings

        warnings.warn(
            "Weights provided but no requested operations use them.",
            stacklevel=2,
        )
    vi, wi = value_weight_indexes(len(value_names), len(weight_names))
    pairs = [
        (value_names[a], (weight_names[b] if b is not None else None))
        for a, b in zip(vi, wi)
    ]

    zset = parse_zone_table(zones)
    store_values = bool(STORED_VALUE_STATS & set(stats))
    ncpu = int(ray.cluster_resources().get("CPU", 8))

    if partials_source is not None:
        # checkpoint/resume path (pipelines/resumable_zonal.py): the partial
        # rows were written per tile band by a previous (possibly crashed)
        # run; merge determinism is unaffected because merge_partial_group
        # sorts by (tile_id, piece) regardless of arrival order.
        partials = partials_source.repartition(ncpu)
    else:
        zones_ref = ray.put(zset)

        # prune the TILE STREAM to the zones' union envelope before the map
        # stage: tiles that cannot intersect any zone never generate / leave
        # storage (an expression filter, pushed into the parquet scan for
        # parquet-backed rasters). Correctness-neutral — dropped tiles
        # contribute nothing; missing zones become NaN rows as usual.
        tiles_ds = _prune_tiles_to_zones(raster, zset)

        stage_args = (
            zones_ref,
            raster.grid.to_dict(),
            store_values,
            pairs,
            coverage_area,
            area_method,
            default_value,
            default_weight,
            bool({"min", "max"} & set(stats)),
            max_cells_per_item,
        )
        if actors:
            partials = tiles_ds.map_batches(
                ZonalPartialStats,
                fn_constructor_args=stage_args,
                batch_format="pyarrow",
                batch_size=None,
                concurrency=concurrency or (1, 8),
            )
        else:
            partials = tiles_ds.map_batches(
                cached_stage(ZonalPartialStats, *stage_args),
                batch_format="pyarrow",
                batch_size=None,
            )

        if return_partials:
            # checkpoint path: hand the raw partial-row Dataset to the caller
            # (resumable_zonal writes it as one parquet partition per band)
            return partials

        # Materialize the partial-stats rows, then coalesce before the
        # groupby. Both are safe by design — partials are ~250-byte
        # aggregation states, orders of magnitude smaller than the tile
        # stream — and both matter: materializing detaches the map stage from
        # the all-to-all (the streaming executor throttles map tasks feeding
        # a pending shuffle: 3.4x slower measured), and coalescing to a
        # CPU-count of blocks keeps the sort shuffle out of the tiny-object
        # regime.
        # (set materialize_partials=False for continuous-valued rasters with
        # store-values stats, where freq maps make partial rows large enough
        # that holding them all is undesirable — the shuffle then streams)
        if materialize_partials:
            partials = partials.materialize()
        partials = partials.repartition(ncpu)

    quantiles = quantiles or [0.5]
    npairs = len(pairs)

    def finalize(group: pd.DataFrame) -> pd.DataFrame:
        out = {"zone_id": [int(group["zone_id"].iloc[0])]}
        for pi in range(npairs):
            sub = group[group["pair_idx"] == pi]
            merged = merge_partial_group(sub, store_values)
            for s in stats:
                if s == "quantile":
                    for q in quantiles:
                        out[f"__{pi}__q{q}"] = [merged.quantile(q)]
                elif s in ("frac", "weighted_frac"):
                    d = merged.result(s)
                    out[f"__{pi}__{s}_values"] = [list(d.keys())]
                    out[f"__{pi}__{s}_shares"] = [list(d.values())]
                else:
                    out[f"__{pi}__{s}"] = [merged.result(s)]
        return pd.DataFrame(out)

    # Vectorized finalize fast path: when every requested stat reduces to
    # the additive moment columns (+ min/max), finalize via ONE pandas
    # groupby-agg per coarse zone group instead of one interpreted merge
    # per zone — at H3-scale zone sets (10^6-10^7 zones) the per-zone
    # map_groups is the exact_dedup-class anti-pattern. Partials sort by
    # (zone, pair, tile[, piece]) first, the same deterministic order the
    # per-zone merge uses; for integer-valued rasters with dyadic
    # coverages every sum is exact in either order (the oracle regime).
    _VEC_STATS = {
        "count", "sum", "mean", "min", "max", "variance_exact",
        "weighted_sum", "weighted_mean",
    }
    vectorizable = (not store_values) and all(s in _VEC_STATS for s in stats)
    if vectorizable:
        _zncoarse = 1024

        def _add_cg(b: pa.Table) -> pa.Table:
            z = b.column("zone_id").to_numpy().astype(np.int64)
            return b.append_column(
                "__cg", pa.array(z % _zncoarse, pa.int64())
            )

        def finalize_vec(g: pd.DataFrame) -> pd.DataFrame:
            sort_cols = ["zone_id", "pair_idx", "tile_id"]
            if "piece" in g.columns:
                sort_cols.append("piece")
            g = g.sort_values(sort_cols, kind="mergesort")
            a = g.groupby(["zone_id", "pair_idx"], sort=True).agg(
                sum_ci=("sum_ci", "sum"),
                sum_xici=("sum_xici", "sum"),
                sum_ciwi=("sum_ciwi", "sum"),
                sum_xiciwi=("sum_xiciwi", "sum"),
                sum_x2ci=("sum_x2ci", "sum"),
                vmin=("vmin", "min"),
                vmax=("vmax", "max"),
            ).reset_index()
            W = a["sum_ci"].to_numpy()
            pos = W > 0
            Wsafe = np.where(pos, W, 1.0)
            vals: dict[str, np.ndarray] = {}
            for s in stats:
                if s == "count":
                    v = W
                elif s == "sum":
                    v = a["sum_xici"].to_numpy()
                elif s == "mean":
                    v = np.where(pos, a["sum_xici"].to_numpy() / Wsafe, np.nan)
                elif s == "min":
                    v = np.where(pos, a["vmin"].to_numpy(), np.nan)
                elif s == "max":
                    v = np.where(pos, a["vmax"].to_numpy(), np.nan)
                elif s == "variance_exact":
                    sx = a["sum_xici"].to_numpy()
                    v = np.where(
                        pos,
                        (a["sum_x2ci"].to_numpy() - sx * sx / Wsafe) / Wsafe,
                        np.nan,
                    )
                elif s == "weighted_sum":
                    v = a["sum_xiciwi"].to_numpy()
                else:  # weighted_mean: nonzero test, matching stats.py
                    Wp = a["sum_ciwi"].to_numpy()
                    nz = Wp != 0
                    v = np.where(
                        nz,
                        a["sum_xiciwi"].to_numpy() / np.where(nz, Wp, 1.0),
                        np.nan,
                    )
                vals[s] = v
            zall = a["zone_id"].to_numpy().astype(np.int64)
            pidx = a["pair_idx"].to_numpy().astype(np.int64)
            zids = np.unique(zall)
            rowpos = np.searchsorted(zids, zall)
            out = {"zone_id": zids}
            for pi in range(npairs):
                m = pidx == pi
                for s in stats:
                    default = (
                        0.0 if s in ("count", "sum", "weighted_sum")
                        else np.nan
                    )
                    col = np.full(len(zids), default)
                    col[rowpos[m]] = vals[s][m]
                    out[f"__{pi}__{s}"] = col
            return pd.DataFrame(out)

        agg = (
            partials.map_batches(_add_cg, batch_format="pyarrow")
            .groupby("__cg")
            .map_groups(finalize_vec, batch_format="pandas")
        )
    else:
        agg = partials.groupby("zone_id").map_groups(
            finalize, batch_format="pandas"
        )
    result = agg.to_pandas()  # one row per zone: small by design
    if stats_sink is not None:
        # executor-level per-stage timings for perf writeups (PERF.md)
        stats_sink["stats"] = agg.stats()

    # fully-disjoint input (NO zone touches the raster): the aggregation is
    # an empty frame with no stat columns, so build the expected
    # __{pi}__{stat} skeleton explicitly — the NaN-padding below then fills
    # every zone (ref returns NA rows for disjoint polygons)
    if len(result) == 0:
        skeleton: dict[str, list] = {"zone_id": []}
        for pi in range(npairs):
            for s in stats:
                if s == "quantile":
                    for q in quantiles:
                        skeleton[f"__{pi}__q{q}"] = []
                elif s in ("frac", "weighted_frac"):
                    skeleton[f"__{pi}__{s}_values"] = []
                    skeleton[f"__{pi}__{s}_shares"] = []
                else:
                    skeleton[f"__{pi}__{s}"] = []
        result = pd.DataFrame(skeleton)
        result["zone_id"] = result["zone_id"].astype(np.int64)

    # zones with no coverage -> NaN rows (ref: test_exact_extract.R:433-485)
    have = set(result["zone_id"]) if len(result) else set()
    missing = [int(z) for z in zset.zone_ids if int(z) not in have]
    if missing:
        pad = {"zone_id": missing}
        for col in result.columns:
            if col == "zone_id":
                continue
            base = col.split("__", 2)[-1]
            if base.endswith("_values") or base.endswith("_shares"):
                pad[col] = [[] for _ in missing]
            else:
                pad[col] = [
                    0.0
                    if base in ("count", "sum", "weighted_sum", "variety")
                    else math.nan
                ] * len(missing)
        result = pd.concat([result, pd.DataFrame(pad)], ignore_index=True)

    # frac/weighted_frac: union observed values across zones AND pairs
    unique_values: list[float] = []
    if store_values and ("frac" in stats or "weighted_frac" in stats):
        uv = set()
        for col in result.columns:
            if col.endswith("_values"):
                for lst in result[col]:
                    uv.update(lst)
        unique_values = sorted(uv)

    # assemble final named columns in reference order: for each pair, each
    # stat (with quantile/frac expansion)
    final = pd.DataFrame({"zone_id": result["zone_id"]})
    nvalues, nweights = len(value_names), len(weight_names)
    for pi, (vname, wname) in enumerate(pairs):
        for s in stats:
            if s == "quantile":
                for q in quantiles:
                    name = (
                        colname_fun or (
                            lambda **kw: make_colname(
                                kw["fun_name"], kw["values"], kw["weights"],
                                kw["fun_value"], full_colnames, nvalues, nweights,
                            )
                        )
                    )(fun_name="quantile", values=vname, weights=wname, fun_value=q,
                      nvalues=nvalues, nweights=nweights)
                    final[name] = result[f"__{pi}__q{q}"]
            elif s in ("frac", "weighted_frac"):
                for v in unique_values:
                    name = (
                        colname_fun or (
                            lambda **kw: make_colname(
                                kw["fun_name"], kw["values"], kw["weights"],
                                kw["fun_value"], full_colnames, nvalues, nweights,
                            )
                        )
                    )(fun_name=s, values=vname, weights=wname, fun_value=v,
                      nvalues=nvalues, nweights=nweights)
                    vcol, scol = f"__{pi}__{s}_values", f"__{pi}__{s}_shares"
                    final[name] = [
                        dict(zip(vl, sl)).get(v, 0.0)
                        for vl, sl in zip(result[vcol], result[scol])
                    ]
            else:
                name = (
                    colname_fun or (
                        lambda **kw: make_colname(
                            kw["fun_name"], kw["values"], kw["weights"],
                            kw["fun_value"], full_colnames, nvalues, nweights,
                        )
                    )
                )(fun_name=s, values=vname, weights=wname, fun_value=None,
                  nvalues=nvalues, nweights=nweights)
                final[name] = result[f"__{pi}__{s}"]

    # restore input order + attach attribute columns (include_cols analog)
    seq = {int(z): int(s) for z, s in zip(zset.zone_ids, zset.zone_seq)}
    final["__seq"] = final["zone_id"].map(seq)
    final = final.sort_values("__seq").drop(columns="__seq").reset_index(drop=True)
    if include_cols:
        zdf = zones.select(["zone_id"] + include_cols).to_pandas()
        final = final.merge(zdf, on="zone_id", how="left")
        final = final[
            ["zone_id"] + include_cols
            + [c for c in final.columns if c not in ("zone_id", *include_cols)]
        ]
    return pa.Table.from_pandas(final, preserve_index=False)


class ZonalCellExtract:
    """map_batches stage: tile batches -> per-cell extraction rows
    (the reference's fun=NULL path, /root/reference/src/exact_extract.cpp:46-237:
    one row per covered cell with value / coverage / optional x, y, cell,
    area)."""

    def __init__(
        self,
        zones_ref,
        grid_dict: dict,
        value_layer: str,
        weight_layer: str | None,
        include_xy: bool,
        include_cell: bool,
        include_area: bool = False,
        area_method: str = "cartesian",
        coverage_area: bool = False,
        default_value: float | None = None,
        default_weight: float | None = None,
    ):
        zones = ray.get(zones_ref) if not isinstance(zones_ref, ZoneSet) else zones_ref
        self.zones = zones
        self.grid = Grid.from_dict(grid_dict)
        self.value_layer = value_layer
        self.weight_layer = weight_layer
        self.include_xy = include_xy
        self.include_cell = include_cell
        self.include_area = include_area
        self.area_method = area_method
        self.coverage_area = coverage_area
        self.default_value = default_value
        self.default_weight = default_weight

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

        cov_name = "coverage_area" if self.coverage_area else "cov"
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
            if self.default_value is not None:
                vals = vals.copy()
                vals[np.isnan(vals)] = self.default_value
            areas = None
            if (
                self.include_area
                or self.coverage_area
                or self.weight_layer == "area"
            ):
                areas = np.asarray(
                    cell_area_matrix(self.grid, row0, th, tw, self.area_method)
                )
            wvals = None
            if self.weight_layer == "area":
                # the reference's area-weights path (R/exact_extract.R:
                # area_weights): cell areas act as the weight raster
                wvals = areas
            elif self.weight_layer is not None:
                wi = weight_rows.get(tid)
                if wi is not None:
                    wvals = np.asarray(
                        values_col[wi].values, dtype=np.float64
                    ).reshape(th, tw)
                    if self.default_weight is not None:
                        wvals = wvals.copy()
                        wvals[np.isnan(wvals)] = self.default_weight
            for zi in zidx:
                # crop to the zone envelope before running the kernel — a
                # small zone on a large tile only pays for its own cells
                e = self.zones.envelopes[zi]
                sub = tile_grid.crop_to_box(Box(e[0], e[1], e[2], e[3]))
                if sub.empty():
                    continue
                cov = zone_coverage(sub, self.zones.parts[zi])
                rr, cc = np.nonzero(cov > 0.0)
                if len(rr) == 0:
                    continue
                covv = cov[rr, cc]
                sr0 = sub.row_offset(tile_grid)
                sc0 = sub.col_offset(tile_grid)
                rr = rr + sr0  # tile-local indices
                cc = cc + sc0
                if self.coverage_area:
                    covv = covv * areas[rr, cc]
                chunk = {
                    "zone_id": np.full(len(rr), self.zones.zone_ids[zi], dtype=np.int64),
                    "value": vals[rr, cc],
                    cov_name: covv,
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
                if self.include_area:
                    chunk["area"] = areas[rr, cc]
                chunks.append(chunk)

        if not chunks:
            return _empty_cells_table(
                cov_name,
                self.weight_layer is not None,
                self.include_xy,
                self.include_cell,
                self.include_area,
            )
        merged = {k: np.concatenate([c[k] for c in chunks]) for k in chunks[0]}
        return pa.table(merged)


def _empty_cells_table(
    cov_name: str, has_weight: bool, include_xy: bool,
    include_cell: bool, include_area: bool,
) -> pa.Table:
    """Zero-row cell-extraction table with the full output schema — the
    reference returns a schema'd empty frame even for polygons disjoint
    from the raster (test_exact_extract_include_args.R:177-201, issue #68)."""
    cols = {
        "zone_id": pa.array([], pa.int64()),
        "value": pa.array([], pa.float64()),
        cov_name: pa.array([], pa.float64()),
    }
    if has_weight:
        cols["weight"] = pa.array([], pa.float64())
    if include_xy:
        cols["x"] = pa.array([], pa.float64())
        cols["y"] = pa.array([], pa.float64())
    if include_cell:
        cols["cell"] = pa.array([], pa.int64())
    if include_area:
        cols["area"] = pa.array([], pa.float64())
    return pa.table(cols)


def extract_cells(
    raster,
    zones: pa.Table,
    value_layer: str = "value",
    weight_layer: str | None = None,
    include_xy: bool = False,
    include_cell: bool = False,
    include_area: bool = False,
    area_method: str = "cartesian",
    coverage_area: bool = False,
    default_value: float | None = None,
    default_weight: float | None = None,
    concurrency=None,
):
    """Per-cell extraction Dataset: one row per (zone, covered cell).

    Streams — suitable for feeding user aggregations via
    ``.groupby("zone_id").map_groups(user_fn)`` (the R UDF path analog,
    /root/reference/R/exact_extract.R:608-765)."""
    zset = parse_zone_table(zones)
    zones_ref = ray.put(zset)
    mapped = _prune_tiles_to_zones(raster, zset).map_batches(
        cached_stage(
            ZonalCellExtract,
            zones_ref,
            raster.grid.to_dict(),
            value_layer,
            weight_layer,
            include_xy,
            include_cell,
            include_area,
            area_method,
            coverage_area,
            default_value,
            default_weight,
        ),
        batch_format="pyarrow",
        batch_size=None,
    )
    # a zero-row schema seed: with every tile pruned away (zones disjoint
    # from the raster) the mapped stream has no blocks, but the reference
    # still returns the full column set (issue #68)
    seed = ray.data.from_arrow(
        _empty_cells_table(
            "coverage_area" if coverage_area else "cov",
            weight_layer is not None,
            include_xy,
            include_cell,
            include_area,
        )
    )
    return mapped.union(seed)


def _num_expected_args(fn) -> int:
    """The reference's .num_expected_args
    (/root/reference/R/exact_extract_helpers.R:209-213): count the
    positional parameters WITHOUT defaults, excluding *args/**kwargs."""
    import inspect

    n = 0
    for p in inspect.signature(fn).parameters.values():
        if p.kind in (p.VAR_POSITIONAL, p.VAR_KEYWORD):
            continue
        if p.default is inspect.Parameter.empty:
            n += 1
    return n


def pad_missing_zones(
    df: pd.DataFrame,
    stats: list[str],
    quantiles: list[float],
    zone_ids,
) -> pd.DataFrame:
    """Disjoint-zone skeleton + the reference's defaults (count/sum/variety
    0, the rest NA — test_exact_extract.R:433-485) for plans whose result
    columns are PLAIN stat names (mixed, partitioned; the broadcast plan
    has per-pair '__{pi}__{stat}' columns and its own variant)."""
    if len(df) == 0:
        skeleton: dict[str, list] = {"zone_id": []}
        for s in stats:
            if s == "quantile":
                for q in quantiles:
                    skeleton[f"q{int(100*q):02d}"] = []
            else:
                skeleton[s] = []
        df = pd.DataFrame(skeleton)
        df["zone_id"] = df["zone_id"].astype(np.int64)
    have = set(df["zone_id"])
    missing = [int(z) for z in zone_ids if int(z) not in have]
    if missing:
        pad: dict[str, list] = {"zone_id": missing}
        for col in df.columns:
            if col != "zone_id":
                pad[col] = [
                    0.0
                    if col in ("count", "sum", "weighted_sum", "variety")
                    else math.nan
                ] * len(missing)
        df = pd.concat([df, pd.DataFrame(pad)], ignore_index=True)
    return df


#: include_* columns the extraction stage can emit, in the reference's
#: positional-frame order (value, include_cols..., x, y, cell, area).
_INCLUDE_ORDER = ("x", "y", "cell", "area")


def _seed_marker_table(
    zset: ZoneSet, raw_cov: str, has_weight: bool, include_xy: bool,
    include_cell: bool, include_area: bool,
) -> pa.Table:
    """One marker row per zone with cov = -1 (no real cell can have negative
    coverage): guarantees a groupby group per zone on the UDF path."""
    n = len(zset.zone_ids)
    nan = [float("nan")] * n
    cols = {
        "zone_id": pa.array([int(z) for z in zset.zone_ids], pa.int64()),
        "value": pa.array(nan, pa.float64()),
        raw_cov: pa.array([-1.0] * n, pa.float64()),
    }
    if has_weight:
        cols["weight"] = pa.array(nan, pa.float64())
    if include_xy:
        cols["x"] = pa.array(nan, pa.float64())
        cols["y"] = pa.array(nan, pa.float64())
    if include_cell:
        cols["cell"] = pa.array([-1] * n, pa.int64())
    if include_area:
        cols["area"] = pa.array(nan, pa.float64())
    return pa.table(cols)


def _zone_attr_ref(zones: pa.Table, include_cols):
    """Broadcast {col: {zone_id: value}} for include_cols (tiny, once)."""
    if not include_cols:
        return None
    zdf = zones.select(["zone_id"] + list(include_cols)).to_pandas()
    amap = {
        c: dict(zip(zdf["zone_id"].to_numpy(), zdf[c].to_numpy()))
        for c in include_cols
    }
    return ray.put(amap)


def _udf_values_arg(df: pd.DataFrame, zone_id: int, include_cols, attr_ref):
    """Positional `values` argument for the UDF: a plain Series normally, a
    data frame (value, include_cols..., x, y, cell, area) when any include_*
    argument was requested (test_exact_extract_include_args.R:146-175)."""
    extras = [c for c in _INCLUDE_ORDER if c in df.columns]
    if not include_cols and not extras:
        return df["value"]
    cols = {"value": df["value"]}
    if include_cols:
        amap = ray.get(attr_ref)
        for c in include_cols:
            cols[c] = np.repeat(amap[c][zone_id], len(df))
    for c in extras:
        cols[c] = df[c]
    return pd.DataFrame(cols)


def _udf_df_form(df: pd.DataFrame, zone_id: int, include_cols, attr_ref):
    """summarize_df=True frame: include_cols inserted right after `value`."""
    if not include_cols:
        return df
    amap = ray.get(attr_ref)
    df = df.copy()
    at = df.columns.get_loc("value") + 1
    for i, c in enumerate(include_cols):
        df.insert(at + i, c, np.repeat(amap[c][zone_id], len(df)))
    return df


def exact_extract_apply(
    raster,
    zones: pa.Table,
    fn,
    value_layer="value",
    weight_layer: str | None = None,
    include_xy: bool = False,
    include_cell: bool = False,
    stack_apply: bool = False,
    summarize_df: bool = False,
    fn_kwargs: dict | None = None,
    append_cols: list[str] | None = None,
    include_cols: list[str] | None = None,
    **kwargs,
):
    """The user-summary-function path (fun=... in the reference,
    /root/reference/R/exact_extract.R:405-430, 608-765) with BOTH reference
    call conventions, selected exactly like R's ``summarize_df`` flag:

    * ``summarize_df=False`` (default, like R): ``fn(values,
      coverage_fractions[, weights], **fn_kwargs)`` — positional vectors
      (pandas Series). fn must accept >= 2 (no weights) / >= 3 (weights)
      non-default args or a ValueError mirrors the reference's message.
      When any ``include_xy`` / ``include_cell`` / ``include_area`` /
      ``include_cols`` is requested, the positional ``values`` argument
      becomes a DATA FRAME with columns ``value``, *include_cols*, ``x``,
      ``y``, ``cell``, ``area`` (the reference's documented behavior —
      tests/testthat/test_exact_extract_include_args.R:146-175); coverage
      fractions and weights remain numeric vectors.
    * ``summarize_df=True``: ``fn(df, **fn_kwargs)`` — one frame per zone
      with the reference's column names: the value column is ``value`` for a
      single layer (multi-layer frames keep layer names via stack_apply),
      the weight column ``weight``, and the coverage column
      ``coverage_fraction`` (``coverage_area`` when coverage_area=True);
      x/y/cell columns appear when requested. fn must accept >= 1 args.

    A multi-row frame returned by fn r-binds across zones with zone_id
    repeated (the reference's data.frame rbind semantics). Runs as
    ``groupby(zone_id).map_groups`` over the streaming per-cell extraction.

    ``stack_apply=True`` with a list of value layers applies the UDF to each
    layer independently and suffixes result columns with ``.{layer}``."""
    # fun type contract (test_exact_extract_errors.R:483-494)
    if not callable(fn):
        raise ValueError(
            "fun must be a character vector, function, or list of functions"
        )
    # arity validation (exact_extract.R:413-430)
    if summarize_df:
        if _num_expected_args(fn) < 1:
            raise ValueError(
                "exact_extract was called with a function that does not "
                "appear to be of the form `function(df, ...)`."
            )
    elif weight_layer is None:
        if _num_expected_args(fn) < 2:
            raise ValueError(
                "exact_extract was called with a function that does not "
                "appear to be of the form `function(values, "
                "coverage_fractions, ...)`. If the summary function should "
                "accept a single data frame argument, set "
                "`summarize_df=True`."
            )
    elif _num_expected_args(fn) < 3:
        raise ValueError(
            "exact_extract was called with a function that does not appear "
            "to be of the form `function(values, coverage_fractions, "
            "weights, ...)`. If the summary function should accept a single "
            "data frame argument, set `summarize_df=True`."
        )

    if stack_apply:
        layers = [value_layer] if isinstance(value_layer, str) else list(value_layer)
        if len(layers) == 1:
            return exact_extract_apply(
                raster, zones, fn,
                value_layer=layers[0], weight_layer=weight_layer,
                include_xy=include_xy, include_cell=include_cell,
                stack_apply=False, summarize_df=summarize_df,
                fn_kwargs=fn_kwargs, include_cols=include_cols,
                append_cols=append_cols, **kwargs,
            )
        # ONE execution: per-layer cell extractions union into a single
        # stream, the UDF runs per (zone, layer) group in one shuffle, and
        # only the tiny UDF RESULT rows (zones x layers) pivot on the driver
        import ray.data as _rd

        cov_name_s = (
            "coverage_area" if kwargs.get("coverage_area") else "coverage_fraction"
        )
        fkw_s = fn_kwargs or {}
        parts_ds = []
        for lay in layers:
            cells = extract_cells(
                raster, zones, value_layer=lay, weight_layer=weight_layer,
                include_xy=include_xy, include_cell=include_cell, **kwargs,
            )
            parts_ds.append(
                cells.map_batches(
                    lambda b, lay=lay: b.append_column(
                        "layer", pa.array([lay] * b.num_rows, pa.string())
                    ),
                    batch_format="pyarrow",
                )
            )
        # per-(zone, layer) marker rows: fn sees a zero-row frame for zones
        # with no covered cells (same contract as the non-stack path)
        raw_cov_s = "coverage_area" if kwargs.get("coverage_area") else "cov"
        zset_s = parse_zone_table(zones)
        for lay in layers:
            seed = _seed_marker_table(
                zset_s, raw_cov_s, weight_layer is not None, include_xy,
                include_cell, bool(kwargs.get("include_area")),
            ).append_column(
                "layer", pa.array([lay] * len(zset_s.zone_ids), pa.string())
            )
            parts_ds.append(ray.data.from_arrow(seed))
        allcells = parts_ds[0].union(*parts_ds[1:])

        attr_ref_s = _zone_attr_ref(zones, include_cols)

        def run_layer(group: pd.DataFrame) -> pd.DataFrame:
            zone_id = int(group["zone_id"].iloc[0])
            lay = group["layer"].iloc[0]
            group = group[group[raw_cov_s] != -1.0]
            df = group.drop(columns=["zone_id", "layer"]).rename(
                columns={"cov": cov_name_s}
            )
            vals = _udf_values_arg(df, zone_id, include_cols, attr_ref_s)
            if summarize_df:
                out = fn(_udf_df_form(df, zone_id, include_cols, attr_ref_s), **fkw_s)
            elif weight_layer is None:
                out = fn(vals, df[cov_name_s], **fkw_s)
            else:
                out = fn(vals, df[cov_name_s], df["weight"], **fkw_s)
            if not isinstance(out, pd.DataFrame):
                out = pd.DataFrame({"result": np.atleast_1d(np.asarray(out))})
            out = out.copy()
            out.insert(0, "zone_id", zone_id)
            out.insert(1, "layer", lay)
            return out

        res = (
            allcells.groupby(["zone_id", "layer"])
            .map_groups(run_layer, batch_format="pandas")
            .to_pandas()  # zones x layers UDF results: small by design
        )
        merged = None
        for lay in layers:
            part = res[res["layer"] == lay].drop(columns=["layer"])
            part = part.rename(
                columns={c: f"{c}.{lay}" for c in part.columns if c != "zone_id"}
            )
            # outer: a zone whose fn returned a zero-row frame for ONE layer
            # keeps its other layers' results (NaN for the missing layer)
            merged = (
                part if merged is None
                else merged.merge(part, on="zone_id", how="outer")
            )
        # input (zone_seq) order, like the non-stack path
        seq_s = {
            int(z): int(s)
            for z, s in zip(zset_s.zone_ids, zset_s.zone_seq)
        }
        merged["__seq"] = merged["zone_id"].map(seq_s)
        merged = (
            merged.sort_values("__seq", kind="stable")
            .drop(columns="__seq")
            .reset_index(drop=True)
        )
        if append_cols:
            zdf_s = zones.select(["zone_id"] + list(append_cols)).to_pandas()
            m = merged.merge(zdf_s, on="zone_id", how="left")
            lead = list(append_cols)
            merged = m[lead + [c for c in m.columns if c not in lead]]
        return _rd.from_pandas(merged.reset_index(drop=True))

    cells = extract_cells(
        raster,
        zones,
        value_layer=value_layer,
        weight_layer=weight_layer,
        include_xy=include_xy,
        include_cell=include_cell,
        **kwargs,
    )
    cov_name = "coverage_area" if kwargs.get("coverage_area") else "coverage_fraction"
    raw_cov = "coverage_area" if kwargs.get("coverage_area") else "cov"
    fkw = fn_kwargs or {}

    attr_ref = _zone_attr_ref(zones, include_cols)
    zset_ids = parse_zone_table(zones)

    # one marker row per zone (cov = -1, impossible for real cells): ensures
    # EVERY zone forms a group, so fn is called with a zero-row frame for
    # polygons with no covered cells — the reference's contract
    # (test_exact_extract.R:433-485: fun=sum returns 0 for a disjoint
    # polygon). run() strips the markers before calling fn.
    cells = cells.union(
        ray.data.from_arrow(
            _seed_marker_table(
                zset_ids, raw_cov, weight_layer is not None, include_xy,
                include_cell, bool(kwargs.get("include_area")),
            )
        )
    )

    def run(group: pd.DataFrame) -> pd.DataFrame:
        zone_id = int(group["zone_id"].iloc[0])
        group = group[group[raw_cov] != -1.0]
        df = group.drop(columns=["zone_id"]).rename(columns={"cov": cov_name})
        vals = _udf_values_arg(df, zone_id, include_cols, attr_ref)
        if summarize_df:
            out = fn(_udf_df_form(df, zone_id, include_cols, attr_ref), **fkw)
        elif weight_layer is None:
            out = fn(vals, df[cov_name], **fkw)
        else:
            out = fn(vals, df[cov_name], df["weight"], **fkw)
        if not isinstance(out, pd.DataFrame):
            # scalar OR vector return (the reference wraps both as 'result';
            # a length-k vector becomes k rows r-bound per zone)
            out = pd.DataFrame({"result": np.atleast_1d(np.asarray(out))})
        out = out.copy()
        out.insert(0, "zone_id", zone_id)
        return out

    out_ds = cells.groupby("zone_id").map_groups(run, batch_format="pandas")

    # the per-zone result table is small by design; materialize to restore
    # input order and attach append_cols
    res = out_ds.to_pandas()
    if "zone_id" not in res.columns:
        # every zone's fn returned a zero-row frame: a schema'd empty result
        res = pd.DataFrame({"zone_id": pd.Series(dtype=np.int64)})

    # input (zone_seq) order, like the reference's per-feature list
    seq = {
        int(z): int(s)
        for z, s in zip(zset_ids.zone_ids, zset_ids.zone_seq)
    }
    res["__seq"] = res["zone_id"].map(seq)
    res = (
        res.sort_values(["__seq"], kind="stable")
        .drop(columns="__seq")
        .reset_index(drop=True)
    )

    if append_cols:
        # the reference's append_cols on the fun path: source attribute
        # columns lead the result, repeated for multi-row UDF frames
        zdf = zones.select(["zone_id"] + list(append_cols)).to_pandas()
        m = res.merge(zdf, on="zone_id", how="left")
        lead = list(append_cols)
        res = m[lead + [c for c in m.columns if c not in lead]]

    import ray.data as _rd

    return _rd.from_pandas(res)
