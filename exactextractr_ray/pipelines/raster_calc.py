"""Map-algebra expression evaluation over raster layers — the
gdal_calc.py / terra::app surface ("A*2 + sqrt(B)" style band math).

The expression is compiled ONCE on the driver from a whitelisted Python
AST (arithmetic, comparisons, ``where``/``abs``/``minimum``/``maximum``
— no attribute access, no calls outside the whitelist, no subscripts),
then evaluated vectorized per tile against the layer arrays inside
``map_batches``. Layers of a tile are paired within the batch (the tile
generator emits all layers of a tile together); zero shuffle; output is
one (cell, result) row per cell.

NODATA follows numpy NaN propagation: arithmetic poisons, comparisons
with NaN are False (so a ``where`` falls through to its else branch) —
the same observable behavior as SQL NULL CASE semantics when the else
branch also references the NULL layer.
"""

from __future__ import annotations

import ast

import numpy as np
import pyarrow as pa

from ..sources.raster import RasterDataset

_ALLOWED_CALLS = {
    "abs": np.abs,
    "minimum": np.minimum,
    "maximum": np.maximum,
    "where": np.where,
    "floor": np.floor,
    "sqrt": np.sqrt,
}
_ALLOWED_NODES = (
    ast.Expression,
    ast.BinOp,
    ast.UnaryOp,
    ast.Compare,
    ast.BoolOp,
    ast.Name,
    ast.Constant,
    ast.Call,
    ast.Load,
    ast.Add,
    ast.Sub,
    ast.Mult,
    ast.Div,
    ast.FloorDiv,
    ast.Mod,
    ast.USub,
    ast.UAdd,
    ast.Gt,
    ast.GtE,
    ast.Lt,
    ast.LtE,
    ast.Eq,
    ast.NotEq,
    ast.And,
    ast.Or,
)


def compile_expr(expr: str, layer_names: list[str]):
    """Validate ``expr`` against the whitelist and return an evaluator
    ``fn(layers: dict[str, np.ndarray]) -> np.ndarray``."""
    tree = ast.parse(expr, mode="eval")
    for node in ast.walk(tree):
        if not isinstance(node, _ALLOWED_NODES):
            raise ValueError(f"disallowed syntax in raster_calc expr: {ast.dump(node)[:60]}")
        if isinstance(node, ast.Call):
            if not isinstance(node.func, ast.Name) or node.func.id not in _ALLOWED_CALLS:
                raise ValueError("only abs/minimum/maximum/where/floor/sqrt calls allowed")
            if node.keywords:
                raise ValueError("keyword arguments not allowed")
        if isinstance(node, ast.Name) and node.id not in _ALLOWED_CALLS and node.id not in layer_names:
            raise ValueError(f"unknown name {node.id!r} (layers: {layer_names})")
    code = compile(tree, "<raster_calc>", "eval")

    def evaluator(layers):
        env = dict(_ALLOWED_CALLS)
        env.update(layers)
        return eval(code, {"__builtins__": {}}, env)

    return evaluator


def raster_calc(raster: RasterDataset, expr: str, layers: tuple[str, ...] = ("value", "weight")):
    """Evaluate ``expr`` over the named layers of every tile. Returns a
    Dataset of (cell:int64, result:float64)."""
    fn = compile_expr(expr, list(layers))
    n_cols = raster.grid.ncol
    need = set(layers)

    def per_batch(batch: pa.Table) -> pa.Table:
        lcol = batch.column("layer").to_pylist()
        tids = batch.column("tile_id").to_numpy()
        vals = batch.column("values")
        row0s = batch.column("row0").to_numpy()
        col0s = batch.column("col0").to_numpy()
        ths = batch.column("th").to_numpy()
        tws = batch.column("tw").to_numpy()
        by_tile: dict[int, dict] = {}
        meta: dict[int, tuple] = {}
        for idx, (t, l) in enumerate(zip(tids, lcol)):
            if l not in need:
                continue
            by_tile.setdefault(int(t), {})[l] = np.asarray(
                vals[idx].values, dtype=np.float64
            )
            meta[int(t)] = (int(row0s[idx]), int(col0s[idx]), int(ths[idx]), int(tws[idx]))
        cells_out, res_out = [], []
        for t, lay in by_tile.items():
            if set(lay) != need:  # pragma: no cover - generator pairs layers
                raise ValueError(f"tile {t}: missing layers {need - set(lay)}")
            row0, col0, th, tw = meta[t]
            rr = np.arange(row0, row0 + th, dtype=np.int64)[:, None]
            cc = np.arange(col0, col0 + tw, dtype=np.int64)[None, :]
            cells_out.append((rr * n_cols + cc).ravel())
            res_out.append(np.asarray(fn(lay), dtype=np.float64).ravel())
        cells = np.concatenate(cells_out) if cells_out else np.empty(0, np.int64)
        res = np.concatenate(res_out) if res_out else np.empty(0, np.float64)
        return pa.table(
            {
                "cell": pa.array(cells, pa.int64()),
                "result": pa.array(res, pa.float64()),
            }
        )

    return raster.ds.map_batches(per_batch, batch_format="pyarrow")


def raster_equalize(raster: RasterDataset, levels: int = 256):
    """Histogram equalization (the classic contrast op; GRASS
    i.histo.eq / skimage.exposure.equalize_hist for integer rasters):
    remap each value v to

        eq(v) = floor((cdf(v) - cdf_min) * (levels - 1) / (N - cdf_min))

    Distributed shape: per-tile value-count partials -> groupby(val).sum
    (exchange = O(distinct values) rows per tile, never cells) -> the
    tiny CDF table is computed once and broadcast via ray.put -> one
    remap pass over the tiles. All arithmetic is exact int64, so the
    DuckDB window-function oracle matches bit-for-bit. NODATA cells stay
    NaN. Returns (cell:int64, eq:float64 — NaN for NODATA)."""
    import ray

    n_cols = raster.grid.ncol

    def counts(batch: pa.Table) -> pa.Table:
        vals_col = batch.column("values")
        layers = batch.column("layer").to_pylist()
        out_v, out_n = [], []
        for i, lay in enumerate(layers):
            if lay != "value":
                continue
            v = np.asarray(vals_col[i].values, dtype=np.float64)
            v = v[~np.isnan(v)]
            uv, cnt = np.unique(v.astype(np.int64), return_counts=True)
            out_v.append(uv)
            out_n.append(cnt.astype(np.int64))
        vv = np.concatenate(out_v) if out_v else np.empty(0, np.int64)
        nn = np.concatenate(out_n) if out_n else np.empty(0, np.int64)
        return pa.table({"val": pa.array(vv, pa.int64()), "n": pa.array(nn, pa.int64())})

    hist = (
        raster.ds.map_batches(counts, batch_format="pyarrow")
        .groupby("val")
        .sum("n")
        .to_pandas()
    )  # O(distinct values) rows — tiny by construction
    hist = hist.sort_values("val")
    vals = hist["val"].to_numpy(np.int64)
    cdf = np.cumsum(hist.iloc[:, 1].to_numpy(np.int64))
    total = int(cdf[-1]) if len(cdf) else 0
    cdf_min = int(cdf[0]) if len(cdf) else 0
    denom = max(total - cdf_min, 1)
    eq = (cdf - cdf_min) * (levels - 1) // denom
    ref = ray.put((vals, eq.astype(np.int64)))

    def remap(batch: pa.Table) -> pa.Table:
        lut_vals, lut_eq = ray.get(ref)
        vals_col = batch.column("values")
        row0s = batch.column("row0").to_numpy()
        col0s = batch.column("col0").to_numpy()
        ths = batch.column("th").to_numpy()
        tws = batch.column("tw").to_numpy()
        layers = batch.column("layer").to_pylist()
        out_c, out_e = [], []
        for i, lay in enumerate(layers):
            if lay != "value":
                continue
            v = np.asarray(vals_col[i].values, dtype=np.float64)
            rr = np.arange(row0s[i], row0s[i] + ths[i], dtype=np.int64)[:, None]
            cc = np.arange(col0s[i], col0s[i] + tws[i], dtype=np.int64)[None, :]
            out_c.append((rr * n_cols + cc).ravel())
            ok = ~np.isnan(v)
            idx = np.searchsorted(lut_vals, v[ok].astype(np.int64))
            e = np.full(len(v), np.nan)
            e[ok] = lut_eq[idx].astype(np.float64)
            out_e.append(e)
        cells = np.concatenate(out_c) if out_c else np.empty(0, np.int64)
        eqs = np.concatenate(out_e) if out_e else np.empty(0, np.float64)
        return pa.table({"cell": pa.array(cells, pa.int64()), "eq": pa.array(eqs, pa.float64())})

    return raster.ds.map_batches(remap, batch_format="pyarrow")
