"""exact_resample on Ray Data: re-grid raster A onto grid B where each
destination cell summarizes the exactly-overlapping source cells.

Reference semantics (/root/reference/R/exact_resample.R:31-105,
/root/reference/src/resample.cpp:52-171): the coverage fraction of each
SOURCE cell under a destination cell's rectangle feeds a RasterStats; any
unweighted stat may be requested; mass (sum) is conserved under regridding
(/root/reference/tests/testthat/test_exact_resample.R:16-43).

Ray shape: stream over SOURCE tiles (the large side). Each task computes the
closed-form rectangle overlaps of its tile's cells with the destination
cells they touch (a separable outer product of x- and y-interval overlaps —
no polygon kernel needed for axis-aligned grids) and emits one partial-stats
row per touched destination cell. A tiny ``groupby(dest_cell)`` merges
partials (a destination cell straddling source-tile edges gets several) and
finalizes the stat. This is zonal statistics with destination cells as the
zones — same shuffle shape, same determinism story.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..grid import Grid
from ..stats import PARTIAL_COLUMNS, STORED_VALUE_STATS, RasterStats, VarState
from ..pipelines.zonal import merge_partial_group, _partial_schema, _empty_partial_table


def _interval_overlaps(
    src_lo: np.ndarray, src_hi: np.ndarray, dst_lo: np.ndarray, dst_hi: np.ndarray
) -> np.ndarray:
    """(n_src, n_dst) overlap lengths of 1-D intervals."""
    lo = np.maximum(src_lo[:, None], dst_lo[None, :])
    hi = np.minimum(src_hi[:, None], dst_hi[None, :])
    return np.clip(hi - lo, 0.0, None)


class ResampleTilePartials:
    """map_batches stage over source tiles -> per-dest-cell partial stats."""

    def __init__(self, src_grid_dict: dict, dst_grid_dict: dict, store_values: bool):
        self.src = Grid.from_dict(src_grid_dict)
        self.dst = Grid.from_dict(dst_grid_dict)
        self.store_values = store_values

    def __call__(self, batch: pa.Table) -> pa.Table:
        layers = batch.column("layer").to_pylist()
        row0s = batch.column("row0").to_numpy()
        col0s = batch.column("col0").to_numpy()
        ths = batch.column("th").to_numpy()
        tws = batch.column("tw").to_numpy()
        tile_ids = batch.column("tile_id").to_numpy()
        values_col = batch.column("values")
        src, dst = self.src, self.dst
        src_area = src.dx * src.dy

        rows_out: list[dict] = []
        for i, lay in enumerate(layers):
            if lay != "value":
                continue
            row0, col0, th, tw = int(row0s[i]), int(col0s[i]), int(ths[i]), int(tws[i])
            vals = np.asarray(values_col[i].values, dtype=np.float64).reshape(th, tw)

            # source cell edges (world coords)
            sx0 = src.xmin + (col0 + np.arange(tw)) * src.dx
            sx1 = sx0 + src.dx
            sy1 = src.ymax - (row0 + np.arange(th)) * src.dy  # top edge
            sy0 = sy1 - src.dy

            # destination cells touched by this tile
            dc0 = max(0, int(np.floor((sx0[0] - dst.xmin) / dst.dx)))
            dc1 = min(dst.ncol - 1, int(np.ceil((sx1[-1] - dst.xmin) / dst.dx)) - 1)
            dr0 = max(0, int(np.floor((dst.ymax - sy1[0]) / dst.dy)))
            dr1 = min(dst.nrow - 1, int(np.ceil((dst.ymax - sy0[-1]) / dst.dy)) - 1)
            if dc1 < dc0 or dr1 < dr0:
                continue
            dcols = np.arange(dc0, dc1 + 1)
            drows = np.arange(dr0, dr1 + 1)
            dx0 = dst.xmin + dcols * dst.dx
            dx1 = dx0 + dst.dx
            dy1 = dst.ymax - drows * dst.dy
            dy0 = dy1 - dst.dy

            xov = _interval_overlaps(sx0, sx1, dx0, dx1) / src_area  # (tw, ndc)
            yov = _interval_overlaps(sy0, sy1, dy0, dy1)  # (th, ndr)
            ndr, ndc = len(drows), len(dcols)

            if not self.store_values:
                # fully vectorized: all dest-cell partial sums at once via
                # separable einsum contractions (cov = yov ⊗ xov)
                nanmask = np.isnan(vals)
                v0 = np.where(nanmask, 0.0, vals)
                m = (~nanmask).astype(np.float64)
                sum_ci = np.einsum("ra,rc,cb->ab", yov, m, xov)
                sum_xc = np.einsum("ra,rc,cb->ab", yov, v0 * m, xov)
                sum_x2c = np.einsum("ra,rc,cb->ab", yov, v0 * v0 * m, xov)
                for a in range(ndr):
                    for b in range(ndc):
                        W = float(sum_ci[a, b])
                        if W <= 0.0:
                            continue
                        st = RasterStats(store_values=False)
                        st.sum_ci = W
                        st.sum_xici = float(sum_xc[a, b])
                        st.sum_x2ci = float(sum_x2c[a, b])
                        st.sum_ciwi = W
                        st.sum_xiciwi = st.sum_xici
                        st.sum_x2ciwi = st.sum_x2ci
                        mu = st.sum_xici / W
                        st.var = VarState(W, mu, max(0.0, st.sum_x2ci - st.sum_xici * mu))
                        st.wvar = VarState(W, mu, st.var.t)
                        # min/max over source cells overlapping this dest cell
                        rs = np.nonzero(yov[:, a] > 0)[0]
                        cs = np.nonzero(xov[:, b] > 0)[0]
                        window = vals[np.ix_(rs, cs)]
                        if np.all(np.isnan(window)):
                            continue
                        st.min = float(np.nanmin(window))
                        st.max = float(np.nanmax(window))
                        row = st.to_row()
                        row["zone_id"] = int(drows[a]) * dst.ncol + int(dcols[b])
                        row["tile_id"] = int(tile_ids[i])
                        rows_out.append(row)
            else:
                finite = ~np.isnan(vals)
                for a, dr in enumerate(drows):
                    ys = yov[:, a]
                    if not np.any(ys > 0):
                        continue
                    for b, dc in enumerate(dcols):
                        xs = xov[:, b]
                        if not np.any(xs > 0):
                            continue
                        cov = np.outer(ys, xs)  # (th, tw) fraction
                        st = RasterStats(store_values=True)
                        st.process(vals, cov)
                        if st.sum_ci == 0 and not st.freq:
                            if not np.any((cov > 0) & finite):
                                continue
                        row = st.to_row()
                        row["zone_id"] = int(dr) * dst.ncol + int(dc)
                        row["tile_id"] = int(tile_ids[i])
                        rows_out.append(row)
        if not rows_out:
            return _empty_partial_table()
        return pa.Table.from_pylist(rows_out, schema=_partial_schema())


def resample_cells(src_raster, dst_grid: Grid, concurrency=None):
    """Per-(dest cell, source cell) overlap rows:
    (cell, row, col, value, cov) — cov = fraction of the SOURCE cell covered
    by the destination cell, like the reference's resample coverage
    (/root/reference/src/resample.cpp:104-155). Feeds exact_resample_apply."""
    from ..util import cached_stage

    src, dst = src_raster.grid, dst_grid

    class _CellRows:
        def __init__(self, src_grid, dst_grid):
            self.src = Grid.from_dict(src_grid)
            self.dst = Grid.from_dict(dst_grid)

        def __call__(self, batch: pa.Table) -> pa.Table:
            srcg, dstg = self.src, self.dst
            src_area = srcg.dx * srcg.dy
            out = {"cell": [], "row": [], "col": [], "value": [], "cov": []}
            layers = batch.column("layer").to_pylist()
            for i, lay in enumerate(layers):
                if lay != "value":
                    continue
                row0 = int(batch.column("row0")[i].as_py())
                col0 = int(batch.column("col0")[i].as_py())
                th = int(batch.column("th")[i].as_py())
                tw = int(batch.column("tw")[i].as_py())
                vals = np.asarray(
                    batch.column("values")[i].values, dtype=np.float64
                ).reshape(th, tw)
                sx0 = srcg.xmin + (col0 + np.arange(tw)) * srcg.dx
                sx1 = sx0 + srcg.dx
                sy1 = srcg.ymax - (row0 + np.arange(th)) * srcg.dy
                sy0 = sy1 - srcg.dy
                dc0 = max(0, int(np.floor((sx0[0] - dstg.xmin) / dstg.dx)))
                dc1 = min(dstg.ncol - 1, int(np.ceil((sx1[-1] - dstg.xmin) / dstg.dx)) - 1)
                dr0 = max(0, int(np.floor((dstg.ymax - sy1[0]) / dstg.dy)))
                dr1 = min(dstg.nrow - 1, int(np.ceil((dstg.ymax - sy0[-1]) / dstg.dy)) - 1)
                if dc1 < dc0 or dr1 < dr0:
                    continue
                dcols = np.arange(dc0, dc1 + 1)
                drows = np.arange(dr0, dr1 + 1)
                dx0 = dstg.xmin + dcols * dstg.dx
                dx1 = dx0 + dstg.dx
                dy1 = dstg.ymax - drows * dstg.dy
                dy0 = dy1 - dstg.dy
                xov = _interval_overlaps(sx0, sx1, dx0, dx1)
                yov = _interval_overlaps(sy0, sy1, dy0, dy1)
                for a, dr in enumerate(drows):
                    for b, dc in enumerate(dcols):
                        cov = np.outer(yov[:, a], xov[:, b]) / src_area
                        rr, cc = np.nonzero(cov > 0)
                        if len(rr) == 0:
                            continue
                        cell = int(dr) * dstg.ncol + int(dc)
                        out["cell"].extend([cell] * len(rr))
                        out["row"].extend([int(dr)] * len(rr))
                        out["col"].extend([int(dc)] * len(rr))
                        out["value"].extend(vals[rr, cc].tolist())
                        out["cov"].extend(cov[rr, cc].tolist())
            return pa.table(
                {
                    "cell": pa.array(out["cell"], pa.int64()),
                    "row": pa.array(out["row"], pa.int64()),
                    "col": pa.array(out["col"], pa.int64()),
                    "value": pa.array(out["value"], pa.float64()),
                    "cov": pa.array(out["cov"], pa.float64()),
                }
            )

    return src_raster.ds.map_batches(
        cached_stage(_CellRows, src.to_dict(), dst.to_dict()),
        batch_format="pyarrow",
        batch_size=None,
    )


def exact_resample_apply(src_raster, dst_grid: Grid, fn, concurrency=None):
    """exact_resample with a user summary function — the reference's
    fun=function path (/root/reference/R/exact_resample.R:31-105): ``fn``
    receives one destination cell's (value, cov) frame and returns a scalar;
    output is a Dataset of (cell, row, col, value).

    Arity contract (R/exact_resample.R:64-66): fn must take exactly two
    non-default positional args (values, coverage_fractions)."""
    from .zonal import _num_expected_args

    if _num_expected_args(fn) != 2:
        raise ValueError(
            "exact_resample was called with a function that does not appear "
            "to be of the form `function(values, coverage_fractions)`."
        )
    cells = resample_cells(src_raster, dst_grid, concurrency)

    def run(group: pd.DataFrame) -> pd.DataFrame:
        v = fn(group["value"].to_numpy(), group["cov"].to_numpy())
        return pd.DataFrame(
            {
                "cell": [int(group["cell"].iloc[0])],
                "row": [int(group["row"].iloc[0])],
                "col": [int(group["col"].iloc[0])],
                "value": [float(v)],
            }
        )

    return cells.groupby("cell").map_groups(run, batch_format="pandas")


def exact_resample(
    src_raster,
    dst_grid: Grid,
    stat: str = "mean",
    quantiles: list[float] | None = None,
    concurrency=None,
):
    """Returns a Dataset of (cell, row, col, value) over the destination grid
    (only cells receiving any source data appear, like the reference's NODATA
    for uncovered cells)."""
    from ..util import cached_stage

    # reference contract (R/exact_resample.R + test_exact_resample.R:45-66):
    # exactly one stat, and weighted stats are meaningless with no weight
    # raster in the resample path
    if not isinstance(stat, str) or not stat:
        raise ValueError("Only a single stat may be used for resampling")
    from .zonal import WEIGHTED_STATS

    if stat in WEIGHTED_STATS:
        raise ValueError(f"'{stat}' cannot be used for resampling")

    store_values = stat in STORED_VALUE_STATS
    partials = src_raster.ds.map_batches(
        cached_stage(
            ResampleTilePartials,
            src_raster.grid.to_dict(),
            dst_grid.to_dict(),
            store_values,
        ),
        batch_format="pyarrow",
        batch_size=None,
    )
    import ray

    # see zonal.exact_extract: detach the map stage from the shuffle and
    # coalesce the small partial rows
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    partials = partials.materialize().repartition(ncpu)
    ncol = dst_grid.ncol

    # Moment-only stats finalize VECTORIZED over coarse dest-cell groups —
    # one pandas groupby-agg per ~1/1024 of the destination grid instead of
    # one interpreted merge per destination cell (the exact_dedup-class
    # anti-pattern at dense dst grids: a 10^8-cell destination would mean
    # 10^8 Python calls). Partials sort by (zone_id, tile_id) first, so the
    # C-speed sums reduce in the same deterministic order as the per-key
    # path; for integer-valued rasters every sum is exact either way.
    _MOMENT_STATS = {"count", "sum", "mean", "min", "max", "variance_exact"}
    if stat in _MOMENT_STATS:
        ncoarse = 1024

        def add_coarse(b: pa.Table) -> pa.Table:
            z = b.column("zone_id").to_numpy().astype(np.int64)
            return b.append_column(
                "__cg", pa.array(z % ncoarse, pa.int64())
            )

        def finalize_vec(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(["zone_id", "tile_id"], kind="mergesort")
            agg = g.groupby("zone_id", sort=True).agg(
                sum_ci=("sum_ci", "sum"),
                sum_xici=("sum_xici", "sum"),
                sum_x2ci=("sum_x2ci", "sum"),
                vmin=("vmin", "min"),
                vmax=("vmax", "max"),
            )
            agg = agg[agg["sum_ci"] > 0]
            if stat == "count":
                val = agg["sum_ci"].to_numpy()
            elif stat == "sum":
                val = agg["sum_xici"].to_numpy()
            elif stat == "mean":
                val = agg["sum_xici"].to_numpy() / agg["sum_ci"].to_numpy()
            elif stat == "min":
                val = agg["vmin"].to_numpy()
            elif stat == "max":
                val = agg["vmax"].to_numpy()
            else:  # variance_exact — same expression as stats.py
                w = agg["sum_ci"].to_numpy()
                sx = agg["sum_xici"].to_numpy()
                val = (agg["sum_x2ci"].to_numpy() - sx * sx / w) / w
            cell = agg.index.to_numpy().astype(np.int64)
            return pd.DataFrame(
                {
                    "cell": cell,
                    "row": cell // ncol,
                    "col": cell % ncol,
                    "value": val.astype(np.float64),
                }
            )

        return (
            partials.map_batches(add_coarse, batch_format="pyarrow")
            .groupby("__cg")
            .map_groups(finalize_vec, batch_format="pandas")
        )

    def finalize(group: pd.DataFrame) -> pd.DataFrame:
        merged = merge_partial_group(group, store_values)
        cell = int(group["zone_id"].iloc[0])
        val = merged.result(stat, quantiles)
        if isinstance(val, list):
            val = val[0]
        if merged.sum_ci == 0:
            return pd.DataFrame(
                {"cell": [], "row": [], "col": [], "value": []}
            ).astype({"cell": np.int64, "row": np.int64, "col": np.int64})
        return pd.DataFrame(
            {
                "cell": [cell],
                "row": [cell // ncol],
                "col": [cell % ncol],
                "value": [float(val)],
            }
        )

    return partials.groupby("zone_id").map_groups(finalize, batch_format="pandas")


def raster_pyramid(
    src_raster,
    factors: tuple[int, ...] = (2, 4, 8),
    stat: str = "sum",
    concurrency=None,
):
    """Overview pyramid (GDAL BuildOverviews analog; the reference has no
    pyramid op): one exact_resample per downscale factor, each from the
    ORIGINAL source raster (no level-to-level error accumulation), tagged
    with its factor and unioned into one Dataset of
    (level, cell, row, col, value).

    Every level streams the source tiles independently — levels execute
    as parallel branches of one Dataset union, so the whole pyramid is a
    single streaming job. Requires each factor to divide the source grid
    evenly (the aligned-overview case; exact_resample itself handles
    ragged grids if callers need them level-by-level)."""
    import ray.data

    from ..grid import Grid

    g = src_raster.grid
    out = []
    for f in factors:
        f = int(f)
        if f <= 0:
            raise ValueError(f"factor must be positive, got {f}")
        dst = Grid(g.xmin, g.ymin, g.xmax, g.ymax, g.dx * f, g.dy * f)
        lvl = exact_resample(src_raster, dst, stat=stat, concurrency=concurrency)

        def tag(b, f=f):
            import pyarrow as pa

            return b.append_column(
                "level", pa.array(np.full(b.num_rows, f, np.int64), pa.int64())
            )

        out.append(lvl.map_batches(tag, batch_format="pyarrow"))
    ds = out[0]
    for o in out[1:]:
        ds = ds.union(o)
    return ds


def resample_bilinear_2x(src_raster, broadcast_cap: int | None = None):
    """Bilinear 2x upsampling (GDAL ``-r bilinear`` at scale=2) — the
    interpolating counterpart of the area-weighted ``exact_resample``.

    Each target cell center falls a quarter-cell off the source lattice,
    so the four bilinear weights are the exact dyadics {0.25, 0.75} x
    {0.25, 0.75}: every output value is an exact float64 regardless of
    evaluation order, and the DuckDB oracle's identical formula matches
    bit-for-bit. Any NaN (NODATA or off-raster) among a target's four
    source neighbors poisons that target cell (weights are never zero),
    the conservative GDAL NODATA convention.

    Targets near a tile boundary need the neighboring source row/column,
    so this rides the same 1-deep halo exchange as the focal family
    (``pipelines/focal.py:_run_focal``) — each tile emits exactly the
    (2*th x 2*tw) target block over its own footprint; no target is
    computed twice at any tiling.

    Returns a Dataset of (tcell:int64 on the 2n-wide target grid,
    value:float64).
    """
    from .focal import _run_focal

    n_cols = src_raster.grid.ncol

    def window(canvas, row0, col0, th, tw) -> pa.Table:
        k = 1
        i = np.arange(2 * th)
        j = np.arange(2 * tw)
        rows_lo = np.where(i % 2 == 0, i // 2 - 1, i // 2) + k
        cols_lo = np.where(j % 2 == 0, j // 2 - 1, j // 2) + k
        wy_lo = np.where(i % 2 == 0, 0.25, 0.75)[:, None]
        wx_lo = np.where(j % 2 == 0, 0.25, 0.75)[None, :]
        wy_hi = 1.0 - wy_lo
        wx_hi = 1.0 - wx_lo
        v00 = canvas[np.ix_(rows_lo, cols_lo)]
        v01 = canvas[np.ix_(rows_lo, cols_lo + 1)]
        v10 = canvas[np.ix_(rows_lo + 1, cols_lo)]
        v11 = canvas[np.ix_(rows_lo + 1, cols_lo + 1)]
        val = wy_lo * (wx_lo * v00 + wx_hi * v01) + wy_hi * (
            wx_lo * v10 + wx_hi * v11
        )
        tr = (2 * row0 + i)[:, None]
        tc = (2 * col0 + j)[None, :]
        tcell = (tr * (2 * n_cols) + tc).astype(np.int64)
        return pa.table(
            {
                "tcell": pa.array(tcell.ravel(), pa.int64()),
                "value": pa.array(val.ravel(), pa.float64()),
            }
        )

    return _run_focal(src_raster, window, broadcast_cap)
