"""Exact per-cell coverage fractions of polygons over a grid.

This computes the same quantity as the reference's RasterCellIntersection
(/root/reference/src/exactextract/src/raster_cell_intersection.cpp:26-142 —
exact fraction of each grid cell covered by a polygon, per-cell traversal
lengths for linestrings) but with a different, vectorized algorithm suited to
numpy batches inside Ray Data tasks:

Instead of the reference's per-cell boundary traversal + flood fill, we use a
scanline/Green's-theorem accumulation (the classic exact-area polygon
rasterization used by anti-grain-geometry-style rasterizers):

* every ring edge is split at the horizontal and vertical grid lines it
  crosses, producing "pieces" that each live inside a single cell;
* a piece contributes ``dv * frac(u_mid)`` of area to its own cell and a
  "cover" increment of ``dv`` that applies a full-width slab to every cell
  left of it in the same row (the winding-number integral of a rightward ray);
* per-row reverse cumulative sums turn the cover increments into interior
  fills — the analog of the reference's FloodFill
  (/root/reference/src/exactextract/src/floodfill.h:62-131), with no
  point-in-polygon queries needed.

The result is exact up to float64 rounding: cells fully inside get exactly
1.0, cells outside exactly 0.0, boundary cells the exact intersection area
over cell area. Holes (CW rings) subtract; self-overlapping multipolygons sum
coverage > 1 exactly as documented by the reference
(/root/reference/R/exact_extract.R:29-31).

Everything is vectorized over edges; cost is O(V + B) where V = ring vertices
and B = boundary-cell crossings, matching the reference's traversal cost.
"""

from __future__ import annotations

import numpy as np

from .grid import Grid


def _edge_pieces(u: np.ndarray, v: np.ndarray, ncol: int, nrow: int):
    """Split closed-ring edges at integer u/v lines.

    u, v: ring vertices in grid coordinates (u = cols from left, v = rows from
    top, both continuous). Returns piece endpoint arrays (ua, va, ub, vb).

    Crossing coordinates are set EXACTLY to the integer grid line (not
    re-lerped) to keep boundary coverage values exact — the same robustness
    concern the reference handles by computing exits from uninterpolated
    coordinates (/root/reference/src/exactextract/src/cell.cpp:104-108).
    """
    u0, v0 = u[:-1], v[:-1]
    u1, v1 = u[1:], v[1:]
    du = u1 - u0
    dv = v1 - v0
    ne = len(u0)
    if ne == 0:
        z = np.empty(0)
        return z, z, z, z

    # --- integer v-crossings, clamped to the grid's row range [0, nrow] ---
    vlo = np.minimum(v0, v1)
    vhi = np.maximum(v0, v1)
    kv_lo = np.maximum(np.ceil(vlo), 0.0)
    kv_hi = np.minimum(np.floor(vhi), float(nrow))
    # strict interior crossings only; crossings at endpoints create
    # zero-length pieces which are harmless, but excluding exact endpoint hits
    # avoids duplicate breakpoints
    kv_lo = np.where(kv_lo == vlo, kv_lo + 1.0, kv_lo)
    kv_hi = np.where(kv_hi == vhi, kv_hi - 1.0, kv_hi)
    nv = np.maximum((kv_hi - kv_lo + 1.0), 0.0)
    nv = np.where(dv == 0.0, 0.0, nv).astype(np.int64)

    # --- integer u-crossings, clamped to [0, ncol] ---
    ulo = np.minimum(u0, u1)
    uhi = np.maximum(u0, u1)
    ku_lo = np.maximum(np.ceil(ulo), 0.0)
    ku_hi = np.minimum(np.floor(uhi), float(ncol))
    ku_lo = np.where(ku_lo == ulo, ku_lo + 1.0, ku_lo)
    ku_hi = np.where(ku_hi == uhi, ku_hi - 1.0, ku_hi)
    nu = np.maximum((ku_hi - ku_lo + 1.0), 0.0)
    nu = np.where(du == 0.0, 0.0, nu).astype(np.int64)

    # --- build (edge_id, t, u_exact, v_exact) breakpoint table ---
    total = int(nv.sum() + nu.sum()) + 2 * ne
    eid = np.empty(total, dtype=np.int64)
    ts = np.empty(total, dtype=np.float64)
    ue = np.full(total, np.nan)
    vexact = np.full(total, np.nan)

    # endpoints (t = 0, 1) with exact coordinates
    eid[:ne] = np.arange(ne)
    ts[:ne] = 0.0
    ue[:ne] = u0
    vexact[:ne] = v0
    eid[ne : 2 * ne] = np.arange(ne)
    ts[ne : 2 * ne] = 1.0
    ue[ne : 2 * ne] = u1
    vexact[ne : 2 * ne] = v1
    off = 2 * ne

    if nv.sum():
        e_v = np.repeat(np.arange(ne), nv)
        # k values per edge: kv_lo[e] + 0..nv[e]-1
        start = np.zeros(len(e_v))
        csum = np.concatenate([[0], np.cumsum(nv)])
        idx_within = np.arange(len(e_v)) - csum[e_v]
        kvals = kv_lo[e_v] + idx_within
        t_v = (kvals - v0[e_v]) / dv[e_v]
        n = len(e_v)
        eid[off : off + n] = e_v
        ts[off : off + n] = t_v
        vexact[off : off + n] = kvals  # exact integer row line
        off += n

    if nu.sum():
        e_u = np.repeat(np.arange(ne), nu)
        csum = np.concatenate([[0], np.cumsum(nu)])
        idx_within = np.arange(len(e_u)) - csum[e_u]
        kvals = ku_lo[e_u] + idx_within
        t_u = (kvals - u0[e_u]) / du[e_u]
        n = len(e_u)
        eid[off : off + n] = e_u
        ts[off : off + n] = t_u
        ue[off : off + n] = kvals  # exact integer column line
        off += n

    # fill non-exact coordinates by lerp
    miss_u = np.isnan(ue)
    ue[miss_u] = u0[eid[miss_u]] + ts[miss_u] * du[eid[miss_u]]
    miss_v = np.isnan(vexact)
    vexact[miss_v] = v0[eid[miss_v]] + ts[miss_v] * dv[eid[miss_v]]

    order = np.lexsort((ts, eid))
    eid, ts, ue, vexact = eid[order], ts[order], ue[order], vexact[order]

    # consecutive breakpoints within the same edge form pieces
    same = eid[:-1] == eid[1:]
    ua, va = ue[:-1][same], vexact[:-1][same]
    ub, vb = ue[1:][same], vexact[1:][same]
    return ua, va, ub, vb


def _accumulate_area(ua, va, ub, vb, nrow: int, ncol: int, area, cover):
    """Accumulate piece contributions into area/cover matrices."""
    dv = vb - va
    keep = dv != 0.0
    if not np.any(keep):
        return
    ua, va, ub, vb, dv = ua[keep], va[keep], ub[keep], vb[keep], dv[keep]
    vmid = 0.5 * (va + vb)
    inrow = (vmid > 0.0) & (vmid < nrow)
    if not np.any(inrow):
        return
    ua, ub, dv, vmid = ua[inrow], ub[inrow], dv[inrow], vmid[inrow]
    r = np.floor(vmid).astype(np.int64)
    np.clip(r, 0, nrow - 1, out=r)
    umid = 0.5 * (ua + ub)
    c = np.floor(umid).astype(np.int64)
    np.clip(c, 0, ncol - 1, out=c)
    # local area: dv * width of the cell part left of the crossing, clamped so
    # pieces right of the grid fill the full cell and pieces left contribute 0
    frac = np.clip(umid - c, 0.0, 1.0)
    np.add.at(area, (r, c), dv * frac)
    np.add.at(cover, (r, c), dv)


def _axis_aligned_rect(parts: list[dict]):
    """If parts form ONE hole-free axis-aligned rectangle, return its box
    (xmin, ymin, xmax, ymax); else None."""
    if len(parts) != 1 or parts[0]["type"] != "Polygon":
        return None
    rings = parts[0]["rings"]
    if len(rings) != 1:
        return None
    ring = rings[0]
    pts = ring[:-1] if np.array_equal(ring[0], ring[-1]) else ring
    if len(pts) != 4:
        return None
    xs = np.unique(pts[:, 0])
    ys = np.unique(pts[:, 1])
    if len(xs) != 2 or len(ys) != 2:
        return None
    # each vertex must sit on a corner (guards rotated quads)
    for p in pts:
        if p[0] not in xs or p[1] not in ys:
            return None
    return float(xs[0]), float(ys[0]), float(xs[1]), float(ys[1])


def rect_coverage_matrix(grid: Grid, box, dtype=np.float64) -> np.ndarray:
    """Closed-form coverage of an axis-aligned rectangle: outer product of
    1-D interval overlaps — the reference's rectangle fast path
    (/root/reference/src/exactextract/src/raster_cell_intersection.cpp:161-248),
    expressed as two O(n) vectors instead of a boundary traversal."""
    xmin, ymin, xmax, ymax = box
    cols = np.arange(grid.ncol)
    x0 = grid.xmin + cols * grid.dx
    xov = np.clip(
        np.minimum(x0 + grid.dx, xmax) - np.maximum(x0, xmin), 0.0, None
    ) / grid.dx
    rows = np.arange(grid.nrow)
    y1 = grid.ymax - rows * grid.dy
    yov = np.clip(
        np.minimum(y1, ymax) - np.maximum(y1 - grid.dy, ymin), 0.0, None
    ) / grid.dy
    return np.outer(yov, xov).astype(dtype, copy=False)


def coverage_matrix(
    grid: Grid, parts: list[dict], dtype=np.float64
) -> np.ndarray:
    """Exact coverage fraction of each cell of ``grid`` for polygon parts.

    parts: list of geometry dicts from wkbio.parse_wkb (Polygon parts used;
    shell rings CCW, holes CW as normalized by the parser). Returns an
    (nrow, ncol) array, row 0 at the top.
    """
    rect = _axis_aligned_rect(parts)
    if rect is not None:
        return rect_coverage_matrix(grid, rect, dtype)
    nrow, ncol = grid.nrow, grid.ncol
    area = np.zeros((nrow, ncol))
    cover = np.zeros((nrow, ncol))
    inv_dx = 1.0 / grid.dx
    inv_dy = 1.0 / grid.dy
    for part in parts:
        if part["type"] != "Polygon":
            continue
        for ring in part["rings"]:
            u = (ring[:, 0] - grid.xmin) * inv_dx
            v = (grid.ymax - ring[:, 1]) * inv_dy
            ua, va, ub, vb = _edge_pieces(u, v, ncol, nrow)
            _accumulate_area(ua, va, ub, vb, nrow, ncol, area, cover)
    # interior fill: cells left of the boundary crossings get full slabs.
    # reverse-exclusive cumsum over columns
    slab = cover[:, ::-1].cumsum(axis=1)[:, ::-1] - cover
    out = area + slab
    # v measured downward flips ring orientation: world-CCW shells integrate
    # negative here, so negate to make shells positive / holes negative.
    np.negative(out, out)
    # clamp float dust: boundary cancellation can leave values a few ULPs
    # outside [0, 1]; true coverage is never negative, and only self-
    # overlapping multipolygons legitimately exceed 1 (by whole winding
    # increments, far beyond the dust band)
    out[(out > -1e-9) & (out < 1e-14)] = 0.0
    near_one = (out > 1.0) & (out < 1.0 + 1e-9)
    out[near_one] = 1.0
    return out.astype(dtype, copy=False)


def length_matrix(grid: Grid, parts: list[dict], dtype=np.float64) -> np.ndarray:
    """Per-cell traversal length of linestring parts, in world units —
    the linear-geometry mode of RasterCellIntersection
    (/root/reference/src/exactextract/src/raster_cell_intersection.cpp:98-142)."""
    nrow, ncol = grid.nrow, grid.ncol
    out = np.zeros((nrow, ncol))
    inv_dx = 1.0 / grid.dx
    inv_dy = 1.0 / grid.dy
    for part in parts:
        if part["type"] != "LineString":
            continue
        coords = part["coords"]
        u = (coords[:, 0] - grid.xmin) * inv_dx
        v = (grid.ymax - coords[:, 1]) * inv_dy
        ua, va, ub, vb = _edge_pieces(u, v, ncol, nrow)
        if len(ua) == 0:
            continue
        umid = 0.5 * (ua + ub)
        vmid = 0.5 * (va + vb)
        inside = (umid > 0.0) & (umid < ncol) & (vmid > 0.0) & (vmid < nrow)
        if not np.any(inside):
            continue
        ua, va, ub, vb = ua[inside], va[inside], ub[inside], vb[inside]
        r = np.clip(np.floor(0.5 * (va + vb)).astype(np.int64), 0, nrow - 1)
        c = np.clip(np.floor(0.5 * (ua + ub)).astype(np.int64), 0, ncol - 1)
        seg_len = np.hypot((ub - ua) * grid.dx, (vb - va) * grid.dy)
        np.add.at(out, (r, c), seg_len)
    return out.astype(dtype, copy=False)


def coverage_fraction_wkb(grid: Grid, wkb: bytes, dtype=np.float64) -> np.ndarray:
    """Convenience: WKB polygon -> coverage matrix over grid."""
    from . import wkbio  # module-level circular-import guard

    return coverage_matrix(grid, wkbio.parse_wkb(wkb), dtype=dtype)
