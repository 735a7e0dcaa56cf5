"""Focal (moving-window) raster statistics with tile HALO EXCHANGE.

The one distributed-raster pattern the zonal pipelines don't exercise: a
3x3 focal window needs each tile's neighbors' border cells, so tiles cannot
be processed independently. The Ray-Data-native shape is a two-stage
exchange:

1. **halo fan-out** (``map_batches``): every tile emits its full body keyed
   by its own tile id PLUS up to 8 thin border strips keyed by each
   neighbor's tile id (1-cell-deep rows/cols/corners). Shuffle volume is
   the raster once + O(perimeter) per tile — the strips are ~2/tile_width
   of the data, so the exchange stays within a few percent of a plain
   repartition at production tile sizes (256-1024 px).
2. **assemble + compute** (``groupby(dst_tile).map_groups``): each group
   holds exactly one full tile plus its incoming strips; they are placed
   into a NaN-padded (th+2, tw+2) canvas by absolute offset and the focal
   sum/count/mean are computed with nine vectorized shifted adds. Cells
   whose window crosses the raster edge simply see fewer valid neighbors
   (the canvas halo outside the raster stays NaN) — the standard
   edge-shrink convention.

NODATA semantics follow the reference's NA model (NaN values are skipped,
/root/reference/src/exactextract/src/raster.h:86-97): a NaN cell
contributes to no window, and a window with zero valid cells yields
count 0 / sum 0.0 / mean NaN.

Determinism: synth rasters are integer-valued (< 1000), so the <= 9-term
float64 window sums are exact in any order and the DuckDB self-join oracle
matches bit-for-bit (mean is the single division sum/count on identical
operands).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..sources.raster import RasterDataset


def _halo_fanout(
    batch: pa.Table,
    tiles_y: int,
    tiles_x: int,
    include_body: bool = True,
    k: int = 1,
) -> pa.Table:
    """Tile rows -> tagged fragments (dst_tile, row0, col0, h, w, values).

    One full-body fragment per tile (unless ``include_body=False``) + one
    ``k``-cell-deep strip per existing neighbor (k = window radius).
    Fragments carry ABSOLUTE grid offsets so assembly is pure arithmetic.
    Requires k <= tile size (one-tile-deep halo; production tiles are
    256-1024 px, windows 3-11 px, so this never binds in practice).
    """
    dst, r0s, c0s, hs, ws, bodies, vals = [], [], [], [], [], [], []
    tys = batch.column("ty").to_numpy()
    txs = batch.column("tx").to_numpy()
    row0s = batch.column("row0").to_numpy()
    col0s = batch.column("col0").to_numpy()
    ths = batch.column("th").to_numpy()
    tws = batch.column("tw").to_numpy()
    values = batch.column("values").combine_chunks()
    for i in range(batch.num_rows):
        ty, tx = int(tys[i]), int(txs[i])
        row0, col0 = int(row0s[i]), int(col0s[i])
        th, tw = int(ths[i]), int(tws[i])
        # zero-copy view of the tile body (no Python-list round trip)
        v = np.asarray(values[i].values, dtype=np.float64).reshape(th, tw)

        def emit(
            dty: int, dtx: int, frag: np.ndarray, fr0: int, fc0: int,
            is_body: int = 0,
        ):
            dst.append((ty + dty) * tiles_x + (tx + dtx))
            r0s.append(fr0)
            c0s.append(fc0)
            hs.append(frag.shape[0])
            ws.append(frag.shape[1])
            bodies.append(is_body)
            vals.append(frag.ravel())

        for dty in (-1, 0, 1):
            if not (0 <= ty + dty < tiles_y):
                continue
            for dtx in (-1, 0, 1):
                if not (0 <= tx + dtx < tiles_x):
                    continue
                if dty == 0 and dtx == 0:
                    if include_body:
                        emit(0, 0, v, row0, col0, is_body=1)
                    continue
                # the k-cell-deep slice of THIS tile adjacent to that
                # neighbor: dty=+1 neighbor sits BELOW us -> it needs our
                # BOTTOM rows; dty=-1 (above) needs our TOP rows; same for
                # columns. Corners combine both.
                kk_r = min(k, th)
                kk_c = min(k, tw)
                rs = {-1: slice(0, kk_r), 0: slice(None),
                      1: slice(th - kk_r, th)}[dty]
                cs = {-1: slice(0, kk_c), 0: slice(None),
                      1: slice(tw - kk_c, tw)}[dtx]
                frag = v[rs, cs]
                fr0 = row0 + (th - kk_r if dty == 1 else 0)
                fc0 = col0 + (tw - kk_c if dtx == 1 else 0)
                emit(dty, dtx, frag, fr0, fc0)

    flat = (
        np.concatenate(vals) if vals else np.empty(0, np.float64)
    ).astype(np.float64)
    offsets = np.zeros(len(vals) + 1, np.int32)
    if vals:
        np.cumsum([len(x) for x in vals], out=offsets[1:])
    return pa.table(
        {
            "dst_tile": pa.array(dst, pa.int64()),
            "row0": pa.array(r0s, pa.int32()),
            "col0": pa.array(c0s, pa.int32()),
            "h": pa.array(hs, pa.int32()),
            "w": pa.array(ws, pa.int32()),
            "is_body": pa.array(bodies, pa.int8()),
            "values": pa.ListArray.from_arrays(offsets, pa.array(flat, pa.float64())),
        }
    )


def _assemble_canvas(group: pa.Table, k: int = 1):
    """Fragment group -> (NaN-padded (th+2k, tw+2k) canvas, row0, col0,
    th, tw).

    The full-body fragment (tagged ``is_body=1`` by ``_halo_fanout``) fixes
    the tile bounds — an explicit tag, NOT argmax area: on a ragged-edge
    tile no deeper than the window radius, an incoming neighbor strip can
    tie or exceed the body's area, and inferring by size would pick the
    wrong fragment (wrong bounds, duplicated cells). Strips land by
    absolute offset. Off-canvas parts of diagonal strips are clipped
    (a corner strip from a ragged neighbor can overhang when k > 1).
    """
    r0s = group.column("row0").to_numpy()
    c0s = group.column("col0").to_numpy()
    hs = group.column("h").to_numpy()
    ws = group.column("w").to_numpy()
    values = group.column("values").combine_chunks()
    body_mask = group.column("is_body").to_numpy()
    body = int(np.argmax(body_mask))
    th, tw = int(hs[body]), int(ws[body])
    row0, col0 = int(r0s[body]), int(c0s[body])
    canvas = np.full((th + 2 * k, tw + 2 * k), np.nan, np.float64)
    for i in range(group.num_rows):
        rr = int(r0s[i]) - (row0 - k)
        cc = int(c0s[i]) - (col0 - k)
        h, w = int(hs[i]), int(ws[i])
        vv = np.asarray(values[i].values, dtype=np.float64).reshape(h, w)
        # clip to the canvas (overhanging strip parts are outside the
        # window of every cell of THIS tile)
        r_lo, c_lo = max(rr, 0), max(cc, 0)
        r_hi = min(rr + h, th + 2 * k)
        c_hi = min(cc + w, tw + 2 * k)
        if r_hi <= r_lo or c_hi <= c_lo:
            continue
        canvas[r_lo:r_hi, c_lo:c_hi] = vv[
            r_lo - rr : r_hi - rr, c_lo - cc : c_hi - cc
        ]
    return canvas, row0, col0, th, tw


def _cell_ids(row0: int, col0: int, th: int, tw: int, n_cols: int) -> np.ndarray:
    rr, cc = np.meshgrid(
        np.arange(row0, row0 + th, dtype=np.int64),
        np.arange(col0, col0 + tw, dtype=np.int64),
        indexing="ij",
    )
    return (rr * n_cols + cc).ravel()


# estimated-strip-bytes ceiling for the broadcast fast path (per-node heap
# budget; generous 4x slack for Arrow/Python overhead is applied below)
_BROADCAST_STRIP_CAP = 64 << 20


def _run_focal(
    raster: RasterDataset,
    window_fn,
    broadcast_cap: int | None = None,
    k: int = 1,
):
    """Run a (2k+1)x(2k+1) window kernel over every tile with its k-cell
    halo.

    ``window_fn(canvas, row0, col0, th, tw) -> pa.Table`` sees the
    NaN-padded (th+2, tw+2) canvas.

    Two physical plans, chosen by a DRIVER-SIDE size estimate (pure
    arithmetic on the grid — nothing executes to decide):

    * **broadcast halo** (strips fit under ``broadcast_cap``): only the
      border strips — ~2/tile_width of the raster — are collected once and
      ``ray.put``; tile bodies NEVER move, each tile task reads its 8
      strips from the local object store. This is the single-node /
      moderate-raster fast path.
    * **shuffle halo** (the general 100-TB path): strips AND bodies fan
      out keyed by dst tile, one groupby co-locates each tile with its
      halo. Chosen whenever the strip total could not sit in one heap.

    Both paths run the identical kernel on identical canvases — outputs
    are byte-identical (tested with the cap forced to 0).
    """
    import ray

    tiles_y, tiles_x = raster.tiles_y, raster.tiles_x
    cap = _BROADCAST_STRIP_CAP if broadcast_cap is None else broadcast_cap
    est_strips = (
        tiles_y
        * tiles_x
        * (2 * k * (raster.tile_h + raster.tile_w) + 4 * k * k)
        * 8
        * 4
    )

    if est_strips <= cap:
        strips = raster.ds.map_batches(
            _halo_fanout,
            batch_format="pyarrow",
            fn_kwargs={
                "tiles_y": tiles_y,
                "tiles_x": tiles_x,
                "include_body": False,
                "k": k,
            },
        )
        by_dst: dict = {}
        for r in strips.take_all():  # bounded by the cap estimate
            by_dst.setdefault(int(r["dst_tile"]), []).append(
                (
                    int(r["row0"]),
                    int(r["col0"]),
                    int(r["h"]),
                    int(r["w"]),
                    np.asarray(r["values"], np.float64),
                )
            )
        strips_ref = ray.put(by_dst)

        def per_tile(batch: pa.Table) -> pa.Table:
            smap = ray.get(strips_ref)
            tys = batch.column("ty").to_numpy()
            txs = batch.column("tx").to_numpy()
            row0s = batch.column("row0").to_numpy()
            col0s = batch.column("col0").to_numpy()
            ths = batch.column("th").to_numpy()
            tws = batch.column("tw").to_numpy()
            values = batch.column("values").combine_chunks()
            outs = []
            for i in range(batch.num_rows):
                th, tw = int(ths[i]), int(tws[i])
                row0, col0 = int(row0s[i]), int(col0s[i])
                canvas = np.full((th + 2 * k, tw + 2 * k), np.nan, np.float64)
                canvas[k : k + th, k : k + tw] = np.asarray(
                    values[i].values, dtype=np.float64
                ).reshape(th, tw)
                tid = int(tys[i]) * tiles_x + int(txs[i])
                for fr0, fc0, h, w, vals in smap.get(tid, ()):
                    rr = fr0 - (row0 - k)
                    cc = fc0 - (col0 - k)
                    vv = vals.reshape(h, w)
                    r_lo, c_lo = max(rr, 0), max(cc, 0)
                    r_hi = min(rr + h, th + 2 * k)
                    c_hi = min(cc + w, tw + 2 * k)
                    if r_hi <= r_lo or c_hi <= c_lo:
                        continue
                    canvas[r_lo:r_hi, c_lo:c_hi] = vv[
                        r_lo - rr : r_hi - rr, c_lo - cc : c_hi - cc
                    ]
                outs.append(window_fn(canvas, row0, col0, th, tw))
            if not outs:
                return window_fn(
                    np.full((2, 2), np.nan), 0, 0, 0, 0
                )  # typed empty
            return pa.concat_tables(outs)

        return raster.ds.map_batches(per_tile, batch_format="pyarrow")

    frags = raster.ds.map_batches(
        _halo_fanout,
        batch_format="pyarrow",
        fn_kwargs={"tiles_y": tiles_y, "tiles_x": tiles_x, "k": k},
    )

    def assemble(group: pa.Table) -> pa.Table:
        canvas, row0, col0, th, tw = _assemble_canvas(group, k=k)
        return window_fn(canvas, row0, col0, th, tw)

    return frags.groupby("dst_tile").map_groups(assemble, batch_format="pyarrow")


def focal_stats_3x3(raster: RasterDataset, broadcast_cap: int | None = None):
    """Per-cell 3x3 focal sum / count / mean over a tiled raster Dataset.

    Returns a Dataset of (cell:int64, focal_sum:float64, focal_cnt:int64,
    focal_mean:float64), one row per raster cell (including NaN centers —
    the window is about the neighborhood, not the center value).
    """
    n_cols = raster.grid.ncol

    def window(canvas, row0, col0, th, tw) -> pa.Table:
        valid = ~np.isnan(canvas)
        filled = np.where(valid, canvas, 0.0)
        s = np.zeros((th, tw), np.float64)
        c = np.zeros((th, tw), np.int64)
        # fixed (dr, dc) accumulation order -> deterministic float sums
        # (exact anyway for integer-valued rasters)
        for dr in (0, 1, 2):
            for dc in (0, 1, 2):
                s += filled[dr : dr + th, dc : dc + tw]
                c += valid[dr : dr + th, dc : dc + tw]
        mean = np.where(c > 0, s / np.maximum(c, 1), np.nan)
        return pa.table(
            {
                "cell": pa.array(_cell_ids(row0, col0, th, tw, n_cols), pa.int64()),
                "focal_sum": pa.array(s.ravel(), pa.float64()),
                "focal_cnt": pa.array(c.ravel(), pa.int64()),
                "focal_mean": pa.array(mean.ravel(), pa.float64()),
            }
        )

    return _run_focal(raster, window, broadcast_cap)


def focal_majority_3x3(raster: RasterDataset, broadcast_cap: int | None = None):
    """Per-cell 3x3 majority (mode) filter — the classic categorical-raster
    cleanup pass. NaN cells are skipped; ties break to the LARGEST value,
    the reference's mode rule (/root/reference/src/exactextract/src/
    raster_stats.h:176-186); windows with no valid cell yield NaN.

    Same halo exchange as focal_stats_3x3; the per-tile mode is computed by
    ranking each window's 9 candidate (count, value) pairs vectorized —
    no per-cell Python.
    """
    n_cols = raster.grid.ncol

    def window(canvas, row0, col0, th, tw) -> pa.Table:
        stack = np.stack(
            [
                canvas[dr : dr + th, dc : dc + tw]
                for dr in (0, 1, 2)
                for dc in (0, 1, 2)
            ]
        )
        # count occurrences of each candidate within its own window:
        # pairwise equality over the 9-deep axis (81 * th * tw bools — tiny
        # per tile), NaN never equals anything
        eq = stack[:, None, :, :] == stack[None, :, :, :]
        counts = eq.sum(axis=1)  # (9, th, tw) occurrences of stack[i]
        val_key = np.where(np.isnan(stack), -np.inf, stack)
        counts = np.where(np.isnan(stack), 0, counts)
        best_c = counts[0].copy()
        best_v = val_key[0].copy()
        for i in range(1, 9):
            better = (counts[i] > best_c) | (
                (counts[i] == best_c) & (val_key[i] > best_v)
            )
            best_c = np.where(better, counts[i], best_c)
            best_v = np.where(better, val_key[i], best_v)
        mode = np.where(best_c > 0, best_v, np.nan)
        return pa.table(
            {
                "cell": pa.array(_cell_ids(row0, col0, th, tw, n_cols), pa.int64()),
                "focal_mode": pa.array(mode.ravel(), pa.float64()),
                "mode_count": pa.array(
                    np.asarray(best_c).ravel().astype(np.int64), pa.int64()
                ),
            }
        )

    return _run_focal(raster, window, broadcast_cap)


def focal_gradient_3x3(raster: RasterDataset, broadcast_cap: int | None = None):
    """Horn-kernel gradient numerators — the slope/aspect building block
    (Horn 1981, the GDAL DEM convention) kept EXACT: gx = (tr + 2*mr + br)
    - (tl + 2*ml + bl), gy = (bl + 2*bm + br) - (tl + 2*tm + tr), pure
    adds of integer-valued cells (no division by cell size, no trig — the
    caller applies 1/(8*dx) and atan where float tolerance is acceptable).

    Cells whose full 3x3 window contains any NaN (including off-raster
    halo) yield NaN — the standard DEM edge convention.
    """
    n_cols = raster.grid.ncol

    def window(canvas, row0, col0, th, tw) -> pa.Table:
        def w(dr, dc):
            return canvas[dr : dr + th, dc : dc + tw]

        tl, tm, tr = w(0, 0), w(0, 1), w(0, 2)
        ml, mr = w(1, 0), w(1, 2)
        bl, bm, br = w(2, 0), w(2, 1), w(2, 2)
        gx = (tr + 2.0 * mr + br) - (tl + 2.0 * ml + bl)
        gy = (bl + 2.0 * bm + br) - (tl + 2.0 * tm + tr)
        # ANY NaN among the 9 window cells poisons the result (GDAL DEM
        # convention) — including cells a particular kernel coefficient
        # doesn't touch (tm/bm for gx) and the center
        window_nan = np.isnan(canvas[1 : 1 + th, 1 : 1 + tw])
        for dr in (0, 1, 2):
            for dc in (0, 1, 2):
                window_nan |= np.isnan(canvas[dr : dr + th, dc : dc + tw])
        gx = np.where(window_nan, np.nan, gx)
        gy = np.where(window_nan, np.nan, gy)
        return pa.table(
            {
                "cell": pa.array(_cell_ids(row0, col0, th, tw, n_cols), pa.int64()),
                "gx": pa.array(gx.ravel(), pa.float64()),
                "gy": pa.array(gy.ravel(), pa.float64()),
            }
        )

    return _run_focal(raster, window, broadcast_cap)


def zonal_gradient_mean(raster: RasterDataset, zone_bounds):
    """Coverage-weighted zonal mean of the Horn gradient — the raster
    ALGEBRA -> zonal AGGREGATION chain (derive a per-cell product, then
    aggregate it per polygon, exactextractr's `weights=` composition
    expressed as two chained Ray stages).

    ``zone_bounds`` is the small side: [(zone_id, xmin, ymin, xmax, ymax)]
    rectangles, embedded in the task closure (at scale: ray.put + general
    polygons through the coverage kernel — same shape as pipelines/zonal).
    Per batch, every zone's exact cell-overlap area is computed vectorized
    against the gradient cells; windows poisoned by NODATA (NaN gradient)
    drop out. Returns (zone_id, grad_cov, mean_gx, mean_gy).

    Determinism: quarter-cell-aligned zones give dyadic coverages, the
    gradients are integer-valued, so every cov*g product and sum is exact
    in float64 in ANY accumulation order — the oracle matches bit-for-bit.
    """
    import pandas as pd

    g = raster.grid
    n_rows, n_cols = g.nrow, g.ncol
    zb = [(int(z), float(a), float(b), float(c), float(d))
          for z, a, b, c, d in zone_bounds]

    grads = focal_gradient_3x3(raster)

    def partial(batch: pa.Table) -> pa.Table:
        cell = batch.column("cell").to_numpy().astype(np.int64)
        gx = batch.column("gx").to_numpy()
        gy = batch.column("gy").to_numpy()
        ok = ~np.isnan(gx)
        cell, gx, gy = cell[ok], gx[ok], gy[ok]
        r = cell // n_cols
        c = cell % n_cols
        x0 = c.astype(np.float64)
        x1 = x0 + 1.0
        y0 = (n_rows - r - 1).astype(np.float64)
        y1 = y0 + 1.0
        zid, sc, sgx, sgy = [], [], [], []
        for z, zx0, zy0, zx1, zy1 in zb:
            cov = np.maximum(
                0.0, np.minimum(x1, zx1) - np.maximum(x0, zx0)
            ) * np.maximum(0.0, np.minimum(y1, zy1) - np.maximum(y0, zy0))
            m = cov > 0.0
            if not m.any():
                continue
            zid.append(z)
            sc.append(cov[m].sum())
            sgx.append((cov[m] * gx[m]).sum())
            sgy.append((cov[m] * gy[m]).sum())
        return pa.table(
            {
                "zone_id": pa.array(zid, pa.int64()),
                "grad_cov": pa.array(sc, pa.float64()),
                "s_gx": pa.array(sgx, pa.float64()),
                "s_gy": pa.array(sgy, pa.float64()),
            }
        )

    parts = grads.map_batches(partial, batch_format="pyarrow")
    agg = parts.groupby("zone_id").sum(["grad_cov", "s_gx", "s_gy"])

    def finalize(b: pa.Table) -> pa.Table:
        b = b.rename_columns(["zone_id", "grad_cov", "s_gx", "s_gy"])
        cov = b.column("grad_cov").to_numpy()
        return pa.table(
            {
                "zone_id": b.column("zone_id").cast(pa.int64()),
                "grad_cov": b.column("grad_cov"),
                "mean_gx": pa.array(b.column("s_gx").to_numpy() / cov, pa.float64()),
                "mean_gy": pa.array(b.column("s_gy").to_numpy() / cov, pa.float64()),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


def focal_stats(
    raster: RasterDataset, window: int = 3, broadcast_cap: int | None = None
):
    """General (2k+1)x(2k+1) focal sum/count/mean — `window` must be odd
    and <= 2*min(tile_h, tile_w)+1 (one-tile-deep halo). The 3x3 case is
    focal_stats_3x3; larger windows (5, 7, ...) are the blur /
    neighborhood-smoothing kernels. Same two physical plans, k-cell-deep
    strips."""
    if window < 3 or window % 2 == 0:
        raise ValueError("window must be an odd integer >= 3")
    k = window // 2
    if k > min(raster.tile_h, raster.tile_w):
        raise ValueError("window radius exceeds tile size (halo is one tile deep)")
    n_cols = raster.grid.ncol
    w = window

    def window_fn(canvas, row0, col0, th, tw) -> pa.Table:
        valid = ~np.isnan(canvas)
        filled = np.where(valid, canvas, 0.0)
        s = np.zeros((th, tw), np.float64)
        c = np.zeros((th, tw), np.int64)
        for dr in range(w):
            for dc in range(w):
                s += filled[dr : dr + th, dc : dc + tw]
                c += valid[dr : dr + th, dc : dc + tw]
        mean = np.where(c > 0, s / np.maximum(c, 1), np.nan)
        return pa.table(
            {
                "cell": pa.array(_cell_ids(row0, col0, th, tw, n_cols), pa.int64()),
                "focal_sum": pa.array(s.ravel(), pa.float64()),
                "focal_cnt": pa.array(c.ravel(), pa.int64()),
                "focal_mean": pa.array(mean.ravel(), pa.float64()),
            }
        )

    return _run_focal(raster, window_fn, broadcast_cap, k=k)


def focal_median_3x3(raster: RasterDataset, broadcast_cap: int | None = None):
    """Per-cell 3x3 median filter — the salt-and-pepper denoise pass.

    NaN cells are skipped; an even count of valid window cells averages
    the two middle order statistics ((lo+hi)/2 — exact for integer-valued
    rasters, and identical to DuckDB's quantile_cont(0.5) interpolation
    lo + (hi-lo)*0.5 because every intermediate is an exact dyadic);
    windows with no valid cell yield NaN.

    Vectorized: one np.sort of the (9, th, tw) window stack (NaN sorts
    last), two take_along_axis gathers for the middle ranks.
    """
    n_cols = raster.grid.ncol

    def window(canvas, row0, col0, th, tw) -> pa.Table:
        stack = np.stack(
            [
                canvas[dr : dr + th, dc : dc + tw]
                for dr in (0, 1, 2)
                for dc in (0, 1, 2)
            ]
        )
        cnt = (~np.isnan(stack)).sum(axis=0)  # (th, tw)
        srt = np.sort(stack, axis=0)  # NaN last
        safe = np.maximum(cnt, 1)
        lo = ((safe - 1) // 2)[None]
        hi = (safe // 2)[None]
        vlo = np.take_along_axis(srt, lo, axis=0)[0]
        vhi = np.take_along_axis(srt, hi, axis=0)[0]
        med = np.where(cnt > 0, (vlo + vhi) / 2.0, np.nan)
        return pa.table(
            {
                "cell": pa.array(_cell_ids(row0, col0, th, tw, n_cols), pa.int64()),
                "focal_median": pa.array(med.ravel(), pa.float64()),
                "n_valid": pa.array(cnt.ravel().astype(np.int64), pa.int64()),
            }
        )

    return _run_focal(raster, window, broadcast_cap)


def terrain_3x3(raster: RasterDataset, broadcast_cap: int | None = None):
    """Terrain analysis (slope / aspect / hillshade) from the Horn 3x3
    kernel — the gdaldem / terra::terrain surface the reference's users
    pair zonal extraction with (DEM -> slope -> exact_extract).

    One halo exchange computes everything (the gradient is NOT re-derived
    from a second Dataset pass):

    * ``gx``, ``gy`` — Horn numerators, exact integer-valued doubles
      (same kernel and NaN-poisoning as ``focal_gradient_3x3``).
    * ``slope_num`` — gx^2 + gy^2, the squared slope-tangent numerator
      ((8*dx)^2 * tan^2(slope)). Kept as the exact integer so comparisons
      and zonal aggregation stay bit-exact; callers apply atan/sqrt where
      float tolerance is acceptable.
    * ``aspect8`` — compass sector (0=N, 1=NE, ... 7=NW) of the steepest
      DESCENT direction, boundaries at 22.5 degrees via sqrt(2)-1
      threshold comparisons (integer-exact inputs, deterministic floats);
      -1 for flat cells (gx = gy = 0), NaN for NODATA-poisoned windows.
    * ``shade``, ``hillshade`` — Lambertian hillshade, sun azimuth 315 /
      altitude 45, z-factor 1, unit cells (the gdaldem defaults). With
      those constants the formula reduces algebraically to

        shade = ((gx + gy)/16 + sqrt(2)/2)
                / sqrt(1 + gx*gx/64 + gy*gy/64)

      whose operands are all exact dyadic rationals, so the result is
      bit-deterministic (three IEEE-correctly-rounded ops) and the DuckDB
      oracle mirrors the expression tree literally. ``hillshade`` is the
      gdaldem byte scaling floor(1 + 254*max(shade, 0) + 0.5).

    Derivation of the shade constant folding: sun vector (east, north, up)
    = (sin az * cos alt, cos az * cos alt, sin alt) with az=315, alt=45 is
    (-1/2, 1/2, sqrt(2)/2); unnormalized surface normal = (-dz/dx, -dz/dy, 1)
    = (-gx/8, gy/8, 1) (row 0 is north, so dz/dy_north = -gy/8); their dot
    product is gx/16 + gy/16 + sqrt(2)/2.
    """
    n_cols = raster.grid.ncol
    SQ2_HALF = 0.7071067811865476  # float64 nearest sqrt(2)/2
    TAN22 = np.sqrt(2.0) - 1.0  # tan(22.5 deg), same rounding as SQL

    def window(canvas, row0, col0, th, tw) -> pa.Table:
        def w(dr, dc):
            return canvas[dr : dr + th, dc : dc + tw]

        tl, tm, tr = w(0, 0), w(0, 1), w(0, 2)
        ml, mr = w(1, 0), w(1, 2)
        bl, bm, br = w(2, 0), w(2, 1), w(2, 2)
        gx = (tr + 2.0 * mr + br) - (tl + 2.0 * ml + bl)
        gy = (bl + 2.0 * bm + br) - (tl + 2.0 * tm + tr)
        window_nan = np.isnan(canvas[1 : 1 + th, 1 : 1 + tw])
        for dr in (0, 1, 2):
            for dc in (0, 1, 2):
                window_nan |= np.isnan(canvas[dr : dr + th, dc : dc + tw])
        gx = np.where(window_nan, np.nan, gx)
        gy = np.where(window_nan, np.nan, gy)

        slope_num = gx * gx + gy * gy  # exact: integer operands

        # aspect sector of steepest descent: downslope = (-gx, +gy) in
        # (east, north). NaN gradients propagate through the comparisons
        # (all False) and are forced to NaN at the end.
        de = -gx
        dn = gy
        ae = np.abs(de)
        an = np.abs(dn)
        with np.errstate(invalid="ignore"):
            ns = ae <= TAN22 * an
            ew = ~ns & (an <= TAN22 * ae)
            diag = ~ns & ~ew
            asp = np.full(gx.shape, np.nan)
            asp[ns & (dn > 0)] = 0.0
            asp[ns & (dn < 0)] = 4.0
            asp[ew & (de > 0)] = 2.0
            asp[ew & (de < 0)] = 6.0
            asp[diag & (de > 0) & (dn > 0)] = 1.0
            asp[diag & (de > 0) & (dn < 0)] = 3.0
            asp[diag & (de < 0) & (dn < 0)] = 5.0
            asp[diag & (de < 0) & (dn > 0)] = 7.0
            asp[(gx == 0) & (gy == 0)] = -1.0
        asp = np.where(window_nan, np.nan, asp)

        # hillshade — mirror the SQL expression tree exactly (see docstring)
        shade = ((gx + gy) / 16.0 + SQ2_HALF) / np.sqrt(
            1.0 + gx * gx / 64.0 + gy * gy / 64.0
        )
        hs = np.floor(1.0 + 254.0 * np.maximum(shade, 0.0) + 0.5)

        return pa.table(
            {
                "cell": pa.array(_cell_ids(row0, col0, th, tw, n_cols), pa.int64()),
                "gx": pa.array(gx.ravel(), pa.float64()),
                "gy": pa.array(gy.ravel(), pa.float64()),
                "slope_num": pa.array(slope_num.ravel(), pa.float64()),
                "aspect8": pa.array(asp.ravel(), pa.float64()),
                "shade": pa.array(shade.ravel(), pa.float64()),
                "hillshade": pa.array(hs.ravel(), pa.float64()),
            }
        )

    return _run_focal(raster, window, broadcast_cap)


def terrain_indices_3x3(raster: RasterDataset, broadcast_cap: int | None = None):
    """gdaldem TPI / TRI / roughness — the remaining third of the
    gdaldem terrain family (``terrain_3x3`` covers slope/aspect/
    hillshade). All three are exact for integer-valued rasters:

    * ``tpi``  = center - mean(8 neighbors)   (sum/8 is an exact dyadic)
    * ``tri``  = mean(|center - neighbor|)    (Wilson 2007, the gdaldem
      default; sum of integer |diffs| / 8)
    * ``roughness`` = max(window) - min(window) (integer)

    gdaldem computes all three only where the full 3x3 window is valid —
    any NaN (NODATA or off-raster edge) poisons the cell, same as the
    gradient ops.
    """
    n_cols = raster.grid.ncol

    def window(canvas, row0, col0, th, tw) -> pa.Table:
        center = canvas[1 : 1 + th, 1 : 1 + tw]
        nb_sum = np.zeros((th, tw))
        abs_sum = np.zeros((th, tw))
        vmin = center.copy()
        vmax = center.copy()
        window_nan = np.isnan(center)
        for dr in (0, 1, 2):
            for dc in (0, 1, 2):
                if dr == 1 and dc == 1:
                    continue
                v = canvas[dr : dr + th, dc : dc + tw]
                window_nan |= np.isnan(v)
                nb_sum += v
                abs_sum += np.abs(center - v)
                vmin = np.fmin(vmin, v)
                vmax = np.fmax(vmax, v)
        tpi = np.where(window_nan, np.nan, center - nb_sum / 8.0)
        tri = np.where(window_nan, np.nan, abs_sum / 8.0)
        rough = np.where(window_nan, np.nan, vmax - vmin)
        return pa.table(
            {
                "cell": pa.array(_cell_ids(row0, col0, th, tw, n_cols), pa.int64()),
                "tpi": pa.array(tpi.ravel(), pa.float64()),
                "tri": pa.array(tri.ravel(), pa.float64()),
                "roughness": pa.array(rough.ravel(), pa.float64()),
            }
        )

    return _run_focal(raster, window, broadcast_cap)


# ESRI D8 codes in tie-break order: (code, dr, dc); r grows southward
_D8 = (
    (1, 0, 1),    # E
    (2, 1, 1),    # SE
    (4, 1, 0),    # S
    (8, 1, -1),   # SW
    (16, 0, -1),  # W
    (32, -1, -1), # NW
    (64, -1, 0),  # N
    (128, -1, 1),  # NE
)


def flow_direction_d8(raster: RasterDataset, broadcast_cap: int | None = None):
    """D8 flow direction (ESRI/ArcGIS FlowDirection, GRASS r.watershed
    first stage): each cell flows to the neighbor with the steepest
    positive descent rate drop/dist (dist 1 cardinal, sqrt(2) diagonal),
    coded E=1, SE=2, S=4, SW=8, W=16, NW=32, N=64, NE=128.

    The rate comparison avoids sqrt entirely: for positive integer drops,
    rate_a > rate_b  <=>  drop_a^2 * dist_b^2 > drop_b^2 * dist_a^2, so
    the sort key is the exact int64 ``2*drop^2`` (cardinal) / ``drop^2``
    (diagonal); ties keep the first code in ESRI order. Cells with no
    positive drop (flats/sinks) get 0; any NaN in the 3x3 window poisons
    the cell (consistent with the rest of the terrain family).
    """
    n_cols = raster.grid.ncol

    def window(canvas, row0, col0, th, tw) -> pa.Table:
        center = canvas[1 : 1 + th, 1 : 1 + tw]
        window_nan = np.isnan(center)
        best_key = np.zeros((th, tw))
        best_code = np.zeros((th, tw))
        for code, dr, dc in _D8:
            v = canvas[1 + dr : 1 + dr + th, 1 + dc : 1 + dc + tw]
            window_nan |= np.isnan(v)
            drop = center - v
            mult = 2.0 if (dr == 0 or dc == 0) else 1.0
            key = mult * drop * drop
            with np.errstate(invalid="ignore"):
                better = (drop > 0) & (key > best_key)
            best_key = np.where(better, key, best_key)
            best_code = np.where(better, float(code), best_code)
        flowdir = np.where(window_nan, np.nan, best_code)
        return pa.table(
            {
                "cell": pa.array(_cell_ids(row0, col0, th, tw, n_cols), pa.int64()),
                "flowdir": pa.array(flowdir.ravel(), pa.float64()),
            }
        )

    return _run_focal(raster, window, broadcast_cap)


def focal_minmax_3x3(raster: RasterDataset, broadcast_cap: int | None = None):
    """Grey-scale morphology primitives in ONE halo exchange: 3x3 focal
    min (erosion), max (dilation) and the morphological gradient
    (dilation - erosion, the classic edge detector). NaN cells are
    skipped (np.fmin/fmax semantics); windows with no valid cell yield
    NaN. Erosion-then-dilation compositions (opening/closing) chain two
    of these passes. Exact for integer-valued rasters -> bit-exact
    DuckDB MIN/MAX oracle."""
    n_cols = raster.grid.ncol

    def window(canvas, row0, col0, th, tw) -> pa.Table:
        mn = np.full((th, tw), np.nan)
        mx = np.full((th, tw), np.nan)
        for dr in (0, 1, 2):
            for dc in (0, 1, 2):
                win = canvas[dr:dr + th, dc:dc + tw]
                mn = np.fmin(mn, win)
                mx = np.fmax(mx, win)
        grad = mx - mn
        return pa.table(
            {
                "cell": pa.array(
                    _cell_ids(row0, col0, th, tw, n_cols), pa.int64()
                ),
                "focal_min": pa.array(mn.ravel(), pa.float64()),
                "focal_max": pa.array(mx.ravel(), pa.float64()),
                "morph_gradient": pa.array(grad.ravel(), pa.float64()),
            }
        )

    return _run_focal(raster, window, broadcast_cap, k=1)


def morans_i(raster: RasterDataset, broadcast_cap: int | None = None):
    """Global Moran's I spatial autocorrelation (rook adjacency,
    binary weights) for an integer-valued raster — exact via
    centered-integer arithmetic: with S = sum(x) and n cells, the
    centered value n*x_i - S is an integer, so the cross-product sum
    num = sum_adjacent (n*x_i - S)(n*x_j - S), the variance sum
    den = sum (n*x_i - S)^2 and the weight count W are all exact
    int64, and I = (n / W) * num / den is one mirrored float
    expression — bit-exact against a self-join SQL oracle. NaN cells
    are excluded from n, S, W and all sums (their adjacencies drop).

    Two distributed passes: a tiny (n, S) aggregate, then ONE halo
    exchange computing per-tile partial num/den/W (each adjacency
    counted once: the canvas pairs every cell with its east and south
    neighbors only)."""
    import ray

    n_cols = raster.grid.ncol

    # pass 1: n and S (and to exclude NaN, count valid cells)
    def sums(b: pa.Table) -> pa.Table:
        total = 0
        cnt = 0
        vals = b.column("values").combine_chunks()
        for i in range(b.num_rows):
            v = np.asarray(vals[i].values, np.float64)
            m = ~np.isnan(v)
            total += int(np.round(v[m]).sum())
            cnt += int(m.sum())
        return pa.table(
            {
                "s": pa.array([total], pa.int64()),
                "n": pa.array([cnt], pa.int64()),
            }
        )

    agg = raster.ds.map_batches(sums, batch_format="pyarrow").sum(
        ["s", "n"]
    )
    S = int(agg["sum(s)"])
    N = int(agg["sum(n)"])

    def window(canvas, row0, col0, th, tw) -> pa.Table:
        body = canvas[1:1 + th, 1:1 + tw]
        valid = ~np.isnan(body)
        c = np.where(valid, N * np.round(body), 0).astype(np.int64)
        num = 0
        w = 0
        # east + south neighbors only: each rook pair counted once
        for dr, dc in ((0, 1), (1, 0)):
            nb = canvas[1 + dr:1 + dr + th, 1 + dc:1 + dc + tw]
            nv = ~np.isnan(nb)
            cn = np.where(nv, N * np.round(nb), 0).astype(np.int64)
            m = valid & nv
            num += int(((c - S) * (cn - S))[m].sum())
            w += int(m.sum())
        den = int(((c - S)[valid] ** 2).sum())
        return pa.table(
            {
                "num": pa.array([num], pa.int64()),
                "den": pa.array([den], pa.int64()),
                "w": pa.array([w], pa.int64()),
            }
        )

    parts = _run_focal(raster, window, broadcast_cap, k=1).sum(
        ["num", "den", "w"]
    )
    num = int(parts["sum(num)"])
    den = int(parts["sum(den)"])
    w_half = int(parts["sum(w)"])
    W = 2 * w_half  # symmetric weights: each pair contributes twice
    moran = (float(N) / float(W)) * (float(num) * 2.0) / float(den)
    import pandas as pd

    return pd.DataFrame(
        {
            "n": [N], "s": [S], "w_pairs": [w_half],
            "num": [num], "den": [den], "moran_i": [moran],
        }
    )


def gearys_c(raster: RasterDataset, broadcast_cap: int | None = None):
    """Global Geary's C (rook adjacency) — Moran's local-contrast dual:
    C = ((n-1) / (2W)) * sum_adj (x_i - x_j)^2 / sum (x_i - xbar)^2,
    exact via integer difference squares and the same centered-integer
    denominator as morans_i; one mirrored float. C < 1 = positive
    autocorrelation, 1 = none, > 1 = negative."""
    n_cols = raster.grid.ncol

    def sums(b: pa.Table) -> pa.Table:
        total = 0
        cnt = 0
        vals = b.column("values").combine_chunks()
        for i in range(b.num_rows):
            v = np.asarray(vals[i].values, np.float64)
            m = ~np.isnan(v)
            total += int(np.round(v[m]).sum())
            cnt += int(m.sum())
        return pa.table(
            {
                "s": pa.array([total], pa.int64()),
                "n": pa.array([cnt], pa.int64()),
            }
        )

    agg = raster.ds.map_batches(sums, batch_format="pyarrow").sum(
        ["s", "n"]
    )
    S = int(agg["sum(s)"])
    N = int(agg["sum(n)"])

    def window(canvas, row0, col0, th, tw) -> pa.Table:
        body = canvas[1:1 + th, 1:1 + tw]
        valid = ~np.isnan(body)
        x = np.where(valid, np.round(body), 0).astype(np.int64)
        num = 0
        w = 0
        for dr, dc in ((0, 1), (1, 0)):
            nb = canvas[1 + dr:1 + dr + th, 1 + dc:1 + dc + tw]
            nv = ~np.isnan(nb)
            xn = np.where(nv, np.round(nb), 0).astype(np.int64)
            m = valid & nv
            num += int(((x - xn)[m] ** 2).sum())
            w += int(m.sum())
        den = int(((N * x - S)[valid] ** 2).sum())
        return pa.table(
            {
                "num": pa.array([num], pa.int64()),
                "den": pa.array([den], pa.int64()),
                "w": pa.array([w], pa.int64()),
            }
        )

    parts = _run_focal(raster, window, broadcast_cap, k=1).sum(
        ["num", "den", "w"]
    )
    num = int(parts["sum(num)"])
    den = int(parts["sum(den)"])
    w_half = int(parts["sum(w)"])
    # den is in centered-integer units (scaled by N^2); rescale num too:
    # C = ((n-1)/(2W)) * (N^2 * num_adj_sq) / den_centered, W = 2*w_half,
    # and the adjacency sum counts each pair twice in the formula -> the
    # single-counted num doubles
    c_val = (
        (float(N - 1) / float(2 * 2 * w_half))
        * (float(N) * float(N) * float(num) * 2.0)
        / float(den)
    )
    import pandas as pd

    return pd.DataFrame(
        {
            "n": [N], "s": [S], "w_pairs": [w_half],
            "num": [num], "den": [den], "geary_c": [c_val],
        }
    )


def getis_ord_g(raster: RasterDataset, broadcast_cap: int | None = None):
    """Getis-Ord General G (rook adjacency) — the hot-spot clustering
    statistic for POSITIVE-valued rasters: G = sum_adj x_i x_j over
    sum_{i != j} x_i x_j. Entirely integer: the adjacency product sum
    comes from the halo pass, the denominator from the global identity
    S^2 - sum x^2; one final float division. NaN cells excluded."""
    def sums(b: pa.Table) -> pa.Table:
        total = 0
        sq = 0
        cnt = 0
        vals = b.column("values").combine_chunks()
        for i in range(b.num_rows):
            v = np.asarray(vals[i].values, np.float64)
            m = ~np.isnan(v)
            xi = np.round(v[m]).astype(np.int64)
            total += int(xi.sum())
            sq += int((xi * xi).sum())
            cnt += int(m.sum())
        return pa.table(
            {
                "s": pa.array([total], pa.int64()),
                "s2": pa.array([sq], pa.int64()),
                "n": pa.array([cnt], pa.int64()),
            }
        )

    agg = raster.ds.map_batches(sums, batch_format="pyarrow").sum(
        ["s", "s2", "n"]
    )
    S = int(agg["sum(s)"])
    SQ = int(agg["sum(s2)"])
    N = int(agg["sum(n)"])

    def window(canvas, row0, col0, th, tw) -> pa.Table:
        body = canvas[1:1 + th, 1:1 + tw]
        valid = ~np.isnan(body)
        x = np.where(valid, np.round(body), 0).astype(np.int64)
        num = 0
        w = 0
        for dr, dc in ((0, 1), (1, 0)):
            nb = canvas[1 + dr:1 + dr + th, 1 + dc:1 + dc + tw]
            nv = ~np.isnan(nb)
            xn = np.where(nv, np.round(nb), 0).astype(np.int64)
            m = valid & nv
            num += int((x * xn)[m].sum())
            w += int(m.sum())
        return pa.table(
            {
                "num": pa.array([num], pa.int64()),
                "w": pa.array([w], pa.int64()),
            }
        )

    parts = _run_focal(raster, window, broadcast_cap, k=1).sum(
        ["num", "w"]
    )
    num = int(parts["sum(num)"])
    w_half = int(parts["sum(w)"])
    den = S * S - SQ  # sum over ordered pairs i != j of x_i x_j
    g_val = float(num) * 2.0 / float(den)
    import pandas as pd

    return pd.DataFrame(
        {
            "n": [N], "s": [S], "s2": [SQ], "w_pairs": [w_half],
            "num": [num], "den": [den], "general_g": [g_val],
        }
    )


def local_morans_i(raster: RasterDataset, broadcast_cap: int | None = None):
    """Local Moran's I (Anselin LISA) — the per-cell hot/cold-spot MAP:
    I_i = z_i * sum_{j in rook(i)} z_j / m2, carried as exact
    centered-integer components per cell (z in n*x - S units;
    m2 = den/n in the same squared units), so the oracle recomputes
    every cell bit-for-bit. Output one row per valid cell:
    (cell, zi_num, znbr_sum, n_nbrs, local_i) with the single mirrored
    float local_i = n * (zi*znbr) / den."""
    n_cols = raster.grid.ncol

    def sums(b: pa.Table) -> pa.Table:
        total = 0
        cnt = 0
        vals = b.column("values").combine_chunks()
        for i in range(b.num_rows):
            v = np.asarray(vals[i].values, np.float64)
            m = ~np.isnan(v)
            total += int(np.round(v[m]).sum())
            cnt += int(m.sum())
        return pa.table(
            {
                "s": pa.array([total], pa.int64()),
                "n": pa.array([cnt], pa.int64()),
            }
        )

    agg = raster.ds.map_batches(sums, batch_format="pyarrow").sum(
        ["s", "n"]
    )
    S = int(agg["sum(s)"])
    N = int(agg["sum(n)"])

    def den_part(b: pa.Table) -> pa.Table:
        tot = 0
        vals = b.column("values").combine_chunks()
        for i in range(b.num_rows):
            v = np.asarray(vals[i].values, np.float64)
            m = ~np.isnan(v)
            z = N * np.round(v[m]).astype(np.int64) - S
            tot += int((z * z).sum())
        return pa.table({"d": pa.array([tot], pa.int64())})

    den = int(
        raster.ds.map_batches(den_part, batch_format="pyarrow").sum("d")
    )

    def window(canvas, row0, col0, th, tw) -> pa.Table:
        body = canvas[1:1 + th, 1:1 + tw]
        valid = ~np.isnan(body)
        z = np.where(valid, N * np.round(body) - S, 0).astype(np.int64)
        znbr = np.zeros((th, tw), np.int64)
        nn = np.zeros((th, tw), np.int64)
        for dr, dc in ((0, 1), (1, 0), (0, -1), (-1, 0)):
            nb = canvas[1 + dr:1 + dr + th, 1 + dc:1 + dc + tw]
            nv = ~np.isnan(nb)
            zn = np.where(nv, N * np.round(nb) - S, 0).astype(np.int64)
            znbr += np.where(nv, zn, 0)
            nn += nv
        rr, cc = np.nonzero(valid)
        cells = _cell_ids(row0, col0, th, tw, n_cols).reshape(th, tw)
        li = (
            float(N) * (z[rr, cc].astype(np.float64)
                        * znbr[rr, cc].astype(np.float64))
            / float(den)
        )
        return pa.table(
            {
                "cell": pa.array(cells[rr, cc], pa.int64()),
                "zi": pa.array(z[rr, cc], pa.int64()),
                "znbr_sum": pa.array(znbr[rr, cc], pa.int64()),
                "n_nbrs": pa.array(nn[rr, cc], pa.int64()),
                "local_i": pa.array(li, pa.float64()),
            }
        )

    return _run_focal(raster, window, broadcast_cap, k=1)


def join_counts(raster: RasterDataset, threshold: float,
                broadcast_cap: int | None = None):
    """Join-count statistics for the binarized raster (x >= threshold
    -> black): exact BB / WW / BW rook-adjacency counts — the simplest
    spatial-clustering test, all integers."""
    def window(canvas, row0, col0, th, tw) -> pa.Table:
        body = canvas[1:1 + th, 1:1 + tw]
        valid = ~np.isnan(body)
        blk = np.where(valid, body >= threshold, False)
        bb = ww = bw = 0
        for dr, dc in ((0, 1), (1, 0)):
            nb = canvas[1 + dr:1 + dr + th, 1 + dc:1 + dc + tw]
            nv = ~np.isnan(nb)
            nblk = np.where(nv, nb >= threshold, False)
            m = valid & nv
            bb += int((blk & nblk & m).sum())
            ww += int((~blk & ~nblk & m).sum())
            bw += int(((blk ^ nblk) & m).sum())
        return pa.table(
            {
                "bb": pa.array([bb], pa.int64()),
                "ww": pa.array([ww], pa.int64()),
                "bw": pa.array([bw], pa.int64()),
            }
        )

    parts = _run_focal(raster, window, broadcast_cap, k=1).sum(
        ["bb", "ww", "bw"]
    )
    import pandas as pd

    return pd.DataFrame(
        {
            "bb": [int(parts["sum(bb)"])],
            "ww": [int(parts["sum(ww)"])],
            "bw": [int(parts["sum(bw)"])],
        }
    )


def semivariogram(raster: RasterDataset, max_lag: int = 4,
                  broadcast_cap: int | None = None):
    """Empirical semivariogram — THE geostatistics primitive (kriging's
    input): for each lag h = 1..max_lag along the two axes,
    gamma(h) = sum (x_i - x_j)^2 / (2 * n_pairs(h)) over all
    axis-aligned pairs at offset h. Exact: per-lag integer
    (pair count, squared-difference sum) partials from ONE
    max_lag-deep halo exchange; gamma is the single float division.
    NaN pairs drop."""
    k = max_lag

    def window(canvas, row0, col0, th, tw) -> pa.Table:
        body = canvas[k:k + th, k:k + tw]
        valid = ~np.isnan(body)
        x = np.where(valid, np.round(body), 0).astype(np.int64)
        lags, cnts, sums = [], [], []
        for h in range(1, k + 1):
            n_p = 0
            s_p = 0
            for dr, dc in ((0, h), (h, 0)):
                nb = canvas[k + dr:k + dr + th, k + dc:k + dc + tw]
                nv = ~np.isnan(nb)
                xn = np.where(nv, np.round(nb), 0).astype(np.int64)
                m = valid & nv
                n_p += int(m.sum())
                s_p += int(((x - xn)[m] ** 2).sum())
            lags.append(h)
            cnts.append(n_p)
            sums.append(s_p)
        return pa.table(
            {
                "lag": pa.array(lags, pa.int64()),
                "n_pairs": pa.array(cnts, pa.int64()),
                "sq_sum": pa.array(sums, pa.int64()),
            }
        )

    parts = (
        _run_focal(raster, window, broadcast_cap, k=k)
        .groupby("lag")
        .sum(["n_pairs", "sq_sum"])
        .to_pandas()
    )
    parts.columns = ["lag", "n_pairs", "sq_sum"]
    parts = parts.sort_values("lag").reset_index(drop=True)
    parts["gamma"] = parts["sq_sum"] / (2.0 * parts["n_pairs"])
    import pandas as pd

    return pd.DataFrame(parts)
