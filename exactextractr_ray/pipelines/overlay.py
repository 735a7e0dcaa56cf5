"""Exact convex polygon overlay join — the vector-vector
ST_Intersection / areal-overlay operation (PostGIS ST_Intersection +
ST_Area; QGIS "Intersection"): pairwise intersection AREAS of two
convex polygon sets.

Exactness: inputs have integer vertices, and every computation runs in
rational arithmetic (``fractions.Fraction``) — Sutherland–Hodgman
half-plane clipping produces rational vertices, the shoelace area is a
single exact rational, and results are reported as (num, den) int64
pairs in lowest terms. No float enters the pipeline, so the
distributed result is bit-identical at any parallelism and must agree
EXACTLY with the independent reference, which uses a structurally
different algorithm (pairwise edge intersection + contained-vertex
enumeration + angular ordering + shoelace) — two exact algorithms can
only agree by both being right.

Distributed shape: bounding boxes join first (broadcast of the smaller
side's boxes via task closure — the pip_join convention; a
grid-bucketed co-partition is the documented huge-side variant), and
only surviving pairs run the exact clip inside ``map_batches``; the
polygon payloads never shuffle.
"""

from __future__ import annotations

from fractions import Fraction

import numpy as np
import pandas as pd
import pyarrow as pa


def _clip_convex(subject: list, clip: list) -> list:
    """Sutherland–Hodgman: clip convex ``subject`` by convex ``clip``
    (both CCW lists of (Fraction, Fraction)). Returns the clipped
    polygon's vertices (possibly empty)."""
    out = list(subject)
    n = len(clip)
    for i in range(n):
        if not out:
            return []
        ax, ay = clip[i]
        bx, by = clip[(i + 1) % n]
        ex, ey = bx - ax, by - ay

        def inside(p):
            return ex * (p[1] - ay) - ey * (p[0] - ax) >= 0

        def intersect(p, q):
            # line p->q with the clip edge line through a with dir e
            dx, dy = q[0] - p[0], q[1] - p[1]
            denom = ex * dy - ey * dx
            t = (ex * (ay - p[1]) - ey * (ax - p[0])) / denom
            return (p[0] + dx * t, p[1] + dy * t)

        prev = out[-1]
        nxt = []
        for cur in out:
            if inside(cur):
                if not inside(prev):
                    nxt.append(intersect(prev, cur))
                nxt.append(cur)
            elif inside(prev):
                nxt.append(intersect(prev, cur))
            prev = cur
        out = nxt
    return out


def _shoelace2(poly: list) -> Fraction:
    """Twice the signed area, exact."""
    s = Fraction(0)
    n = len(poly)
    for i in range(n):
        x0, y0 = poly[i]
        x1, y1 = poly[(i + 1) % n]
        s += x0 * y1 - x1 * y0
    return s


def _ccw(poly: list) -> list:
    return poly if _shoelace2(poly) >= 0 else poly[::-1]


def intersection_area(pa_: list, pb: list) -> Fraction:
    """Exact intersection area of two convex integer polygons."""
    a = _ccw([(Fraction(x), Fraction(y)) for x, y in pa_])
    b = _ccw([(Fraction(x), Fraction(y)) for x, y in pb])
    clipped = _clip_convex(a, b)
    if len(clipped) < 3:
        return Fraction(0)
    return abs(_shoelace2(clipped)) / 2


def intersection_area_reference(pa_: list, pb: list) -> Fraction:
    """Independent algorithm: enumerate candidate vertices (contained
    vertices of either polygon + all pairwise edge intersections),
    order them around the exact rational centroid, shoelace. Agrees
    with the clipping method only if both are exactly right."""
    a = _ccw([(Fraction(x), Fraction(y)) for x, y in pa_])
    b = _ccw([(Fraction(x), Fraction(y)) for x, y in pb])

    def contains(poly, p):
        n = len(poly)
        for i in range(n):
            ax, ay = poly[i]
            bx, by = poly[(i + 1) % n]
            if (bx - ax) * (p[1] - ay) - (by - ay) * (p[0] - ax) < 0:
                return False
        return True

    pts = [p for p in a if contains(b, p)] + [p for p in b if contains(a, p)]
    na, nb = len(a), len(b)
    for i in range(na):
        p1, p2 = a[i], a[(i + 1) % na]
        for j in range(nb):
            q1, q2 = b[j], b[(j + 1) % nb]
            d1 = (p2[0] - p1[0], p2[1] - p1[1])
            d2 = (q2[0] - q1[0], q2[1] - q1[1])
            denom = d1[0] * d2[1] - d1[1] * d2[0]
            if denom == 0:
                continue
            t = ((q1[0] - p1[0]) * d2[1] - (q1[1] - p1[1]) * d2[0]) / denom
            u = ((q1[0] - p1[0]) * d1[1] - (q1[1] - p1[1]) * d1[0]) / denom
            if 0 <= t <= 1 and 0 <= u <= 1:
                pts.append((p1[0] + d1[0] * t, p1[1] + d1[1] * t))
    uniq = sorted(set(pts))
    if len(uniq) < 3:
        return Fraction(0)
    cx = sum(p[0] for p in uniq) / len(uniq)
    cy = sum(p[1] for p in uniq) / len(uniq)

    def half_angle_key(p):
        # exact angular order: half-plane split + cross-product compare
        dx, dy = p[0] - cx, p[1] - cy
        return (0 if (dy > 0 or (dy == 0 and dx > 0)) else 1, dx, dy)

    import functools

    def cmp(p, q):
        hp = 0 if (p[1] - cy > 0 or (p[1] - cy == 0 and p[0] - cx > 0)) else 1
        hq = 0 if (q[1] - cy > 0 or (q[1] - cy == 0 and q[0] - cx > 0)) else 1
        if hp != hq:
            return -1 if hp < hq else 1
        cross = (p[0] - cx) * (q[1] - cy) - (p[1] - cy) * (q[0] - cx)
        if cross == 0:
            return 0
        return -1 if cross > 0 else 1

    ordered = sorted(uniq, key=functools.cmp_to_key(cmp))
    return abs(_shoelace2(ordered)) / 2


def _poly_fixture(pid: int) -> list:
    """Deterministic integer convex polygon: a hexagon scaled and
    translated by arithmetic rules (shared by the query and the SQL-free
    reference check)."""
    r = 3 + pid % 4
    cx = (pid * 7) % 23
    cy = (pid * 11) % 19
    hexa = [(2, 0), (1, 2), (-1, 2), (-2, 0), (-1, -2), (1, -2)]
    return [(cx + r * x, cy + r * y) for x, y in hexa]


def convex_overlay_areas(n_a: int = 14, n_b: int = 14):
    """Pairwise exact intersection areas of two rule-generated convex
    polygon sets -> pandas (a_id, b_id, area_num, area_den) for every
    overlapping pair (area > 0), areas in lowest terms.

    The B side's bounding boxes broadcast via closure (pip_join
    convention); bbox-surviving pairs clip exactly in map_batches."""
    import ray.data

    b_polys = {j: _poly_fixture(1000 + j) for j in range(n_b)}
    b_boxes = {
        j: (min(x for x, _ in p), min(y for _, y in p),
            max(x for x, _ in p), max(y for _, y in p))
        for j, p in b_polys.items()
    }

    def pairs(batch: pa.Table) -> pa.Table:
        aid_out, bid_out, num_out, den_out = [], [], [], []
        for aid in batch.column("a_id").to_pylist():
            ap = _poly_fixture(aid)
            ax0 = min(x for x, _ in ap)
            ay0 = min(y for _, y in ap)
            ax1 = max(x for x, _ in ap)
            ay1 = max(y for _, y in ap)
            for j, (bx0, by0, bx1, by1) in b_boxes.items():
                if ax1 < bx0 or bx1 < ax0 or ay1 < by0 or by1 < ay0:
                    continue
                area = intersection_area(ap, b_polys[j])
                if area > 0:
                    aid_out.append(aid)
                    bid_out.append(j)
                    num_out.append(int(area.numerator))
                    den_out.append(int(area.denominator))
        return pa.table(
            {
                "a_id": pa.array(aid_out, pa.int64()),
                "b_id": pa.array(bid_out, pa.int64()),
                "area_num": pa.array(num_out, pa.int64()),
                "area_den": pa.array(den_out, pa.int64()),
            }
        )

    ds = ray.data.from_arrow(
        pa.table({"a_id": pa.array(np.arange(n_a, dtype=np.int64))})
    )
    out = ds.map_batches(pairs, batch_format="pyarrow",
                         batch_size=4).to_pandas()
    return out.sort_values(["a_id", "b_id"]).reset_index(drop=True)


def _hull(points: list) -> list:
    """Andrew monotone chain over exact integer/rational points -> CCW
    hull (collinear points dropped)."""
    pts = sorted(set(points))
    if len(pts) <= 2:
        return pts

    def build(seq):
        out = []
        for p in seq:
            while len(out) >= 2:
                ox, oy = out[-2]
                ax, ay = out[-1]
                if (ax - ox) * (p[1] - oy) - (ay - oy) * (p[0] - ox) <= 0:
                    out.pop()
                else:
                    break
            out.append(p)
        return out

    lower = build(pts)
    upper = build(reversed(pts))
    return lower[:-1] + upper[:-1]


def minkowski_sum(poly_a: list, poly_b: list) -> list:
    """Minkowski sum of two convex integer polygons — the exact core of
    ST_Buffer with a polygonal structuring element (buffering A by a
    regular 2k-gon approximates the disc; the sum stays integer-exact).
    Computed as the convex hull of all pairwise vertex sums (exact for
    convex operands)."""
    return _hull([(ax + bx, ay + by) for ax, ay in poly_a
                  for bx, by in poly_b])


def minkowski_sum_reference(poly_a: list, poly_b: list) -> list:
    """Independent algorithm: the edge-merge construction — a convex
    Minkowski sum's boundary is the angular merge of both polygons'
    edge vectors (CCW). Starts at the sum of both lowest-then-leftmost
    vertices; agreement with the hull-of-sums method checks both."""
    a = _ccw([(Fraction(x), Fraction(y)) for x, y in poly_a])
    b = _ccw([(Fraction(x), Fraction(y)) for x, y in poly_b])

    def rot_to_bottom(p):
        i = min(range(len(p)), key=lambda k: (p[k][1], p[k][0]))
        return p[i:] + p[:i]

    a = rot_to_bottom(a)
    b = rot_to_bottom(b)

    def edges(p):
        return [(p[(i + 1) % len(p)][0] - p[i][0],
                 p[(i + 1) % len(p)][1] - p[i][1]) for i in range(len(p))]

    ea, eb = edges(a), edges(b)

    def angle_lt(u, v):
        # CCW-from-east angular compare for edge vectors of a CCW
        # polygon started at its bottom vertex (angles in [0, 2pi))
        def half(w):
            return 0 if (w[1] > 0 or (w[1] == 0 and w[0] > 0)) else 1

        if half(u) != half(v):
            return half(u) < half(v)
        return u[0] * v[1] - u[1] * v[0] > 0

    merged = []
    i = j = 0
    while i < len(ea) or j < len(eb):
        if j >= len(eb) or (i < len(ea) and angle_lt(ea[i], eb[j])):
            merged.append(ea[i])
            i += 1
        elif i >= len(ea) or angle_lt(eb[j], ea[i]):
            merged.append(eb[j])
            j += 1
        else:  # parallel edges: combine
            merged.append((ea[i][0] + eb[j][0], ea[i][1] + eb[j][1]))
            i += 1
            j += 1
    x, y = a[0][0] + b[0][0], a[0][1] + b[0][1]
    out = []
    for dx, dy in merged:
        out.append((x, y))
        x += dx
        y += dy
    # drop any collinear chains the merge may leave
    return _hull(out)


def polygon_area2(poly: list) -> Fraction:
    return abs(_shoelace2([(Fraction(x), Fraction(y)) for x, y in poly]))


def buffered_overlay_areas(n: int = 14):
    """Buffer every A-side fixture polygon by an integer octagon
    (Minkowski sum) and report each buffered polygon's exact area and
    vertex count — the ST_Buffer surface, rule-generated and
    dual-algorithm checkable."""
    import ray.data

    octagon = [(2, 1), (1, 2), (-1, 2), (-2, 1), (-2, -1), (-1, -2),
               (1, -2), (2, -1)]

    def rows(batch: pa.Table) -> pa.Table:
        ids, nv, num, den = [], [], [], []
        for pid in batch.column("a_id").to_pylist():
            s = minkowski_sum(_poly_fixture(pid), octagon)
            a2 = polygon_area2(s)
            ids.append(pid)
            nv.append(len(s))
            num.append(int((a2 / 2).numerator))
            den.append(int((a2 / 2).denominator))
        return pa.table(
            {
                "a_id": pa.array(ids, pa.int64()),
                "n_vertices": pa.array(nv, pa.int64()),
                "area_num": pa.array(num, pa.int64()),
                "area_den": pa.array(den, pa.int64()),
            }
        )

    ds = ray.data.from_arrow(
        pa.table({"a_id": pa.array(np.arange(n, dtype=np.int64))})
    )
    out = ds.map_batches(rows, batch_format="pyarrow",
                         batch_size=4).to_pandas()
    return out.sort_values("a_id").reset_index(drop=True)


def _seg_fixture(sid: int) -> tuple:
    """Deterministic integer segment (x1, y1, x2, y2) in a 64x64 box."""
    x1 = (sid * 17) % 64
    y1 = (sid * 29) % 64
    x2 = (x1 + 5 + (sid * 13) % 21) % 64
    y2 = (y1 + 7 + (sid * 23) % 19) % 64
    return (x1, y1, x2, y2)


def _segments_intersect(a: tuple, b: tuple) -> bool:
    """Exact integer segment intersection (shared point exists),
    including collinear-overlap and endpoint-touch cases — the classic
    orientation-sign predicate."""
    ax1, ay1, ax2, ay2 = a
    bx1, by1, bx2, by2 = b

    def orient(ox, oy, px, py, qx, qy):
        v = (px - ox) * (qy - oy) - (py - oy) * (qx - ox)
        return 0 if v == 0 else (1 if v > 0 else -1)

    o1 = orient(ax1, ay1, ax2, ay2, bx1, by1)
    o2 = orient(ax1, ay1, ax2, ay2, bx2, by2)
    o3 = orient(bx1, by1, bx2, by2, ax1, ay1)
    o4 = orient(bx1, by1, bx2, by2, ax2, ay2)
    if o1 != o2 and o3 != o4:
        return True

    def on_seg(ox, oy, px, py, qx, qy):
        return (min(ox, px) <= qx <= max(ox, px)
                and min(oy, py) <= qy <= max(oy, py))

    if o1 == 0 and on_seg(ax1, ay1, ax2, ay2, bx1, by1):
        return True
    if o2 == 0 and on_seg(ax1, ay1, ax2, ay2, bx2, by2):
        return True
    if o3 == 0 and on_seg(bx1, by1, bx2, by2, ax1, ay1):
        return True
    if o4 == 0 and on_seg(bx1, by1, bx2, by2, ax2, ay2):
        return True
    return False


def segment_intersection_join(n: int = 240, cell: int = 16):
    """Exact segment-segment intersection join (ST_Intersects over two
    line sets' cross pairs restricted to a != b here) via the
    grid-bucket co-partition + RESPONSIBILITY-CELL dedup pattern: each
    segment replicates to the grid cells its bbox covers, candidates
    pair inside one groupby("cell"), the exact integer predicate
    filters, and a pair is EMITTED only by the lexicographically first
    cell both bboxes share — so the all-to-all moves each segment
    O(bbox cells) times and the output needs no second dedup shuffle.
    Bit-exact vs a DuckDB oracle expressing the same orientation-sign
    predicate in SQL."""
    import ray.data

    segs = pa.table(
        {
            "sid": pa.array(np.arange(n, dtype=np.int64)),
        }
    )

    def fanout(batch: pa.Table) -> pa.Table:
        cids, sids = [], []
        for sid in batch.column("sid").to_pylist():
            x1, y1, x2, y2 = _seg_fixture(sid)
            for cx in range(min(x1, x2) // cell, max(x1, x2) // cell + 1):
                for cy in range(min(y1, y2) // cell,
                               max(y1, y2) // cell + 1):
                    cids.append(cy * 64 + cx)
                    sids.append(sid)
        return pa.table(
            {
                "cell": pa.array(cids, pa.int64()),
                "sid": pa.array(sids, pa.int64()),
            }
        )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        cid = int(g["cell"].iloc[0])
        ccy, ccx = divmod(cid, 64)
        out_a, out_b = [], []
        ids = sorted(set(int(v) for v in g["sid"]))
        for i in range(len(ids)):
            a = _seg_fixture(ids[i])
            for j in range(i + 1, len(ids)):
                b = _seg_fixture(ids[j])
                # responsibility cell: first cell both bboxes share
                lox = max(min(a[0], a[2]) // cell,
                          min(b[0], b[2]) // cell)
                loy = max(min(a[1], a[3]) // cell,
                          min(b[1], b[3]) // cell)
                if (loy, lox) != (ccy, ccx):
                    continue
                if _segments_intersect(a, b):
                    out_a.append(ids[i])
                    out_b.append(ids[j])
        return pd.DataFrame({"a_id": out_a, "b_id": out_b})

    import ray.data as rd

    out = (
        rd.from_arrow(segs)
        .map_batches(fanout, batch_format="pyarrow")
        .groupby("cell")
        .map_groups(pairs, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values(["a_id", "b_id"]).reset_index(drop=True)


def hull_calipers(n_groups: int = 10, pts_per_group: int = 40):
    """Rotating-calipers hull metrics per point group — the
    ST_MaxDistance / ST_OrientedEnvelope surface: squared diameter
    (exact int64; SQL recomputes it as the max pairwise squared
    distance) and the minimum-area bounding rectangle's exact rational
    area (min over hull-edge-aligned rectangles — the classic calipers
    theorem; verified against brute force over edges in the tests).

    Distributed shape: (grp, x, y) rows shuffle to their group once;
    per-group work is O(n log n) hull + O(h^2) exact metrics (h = hull
    size) — the same bound as the existing convex-hull stages."""
    import ray.data

    def gen(batch: pa.Table) -> pa.Table:
        gs, xs, ys = [], [], []
        for g in batch.column("grp").to_pylist():
            for i in range(pts_per_group):
                gs.append(g)
                xs.append((g * 31 + i * 13) % 41)
                ys.append((g * 17 + i * 19) % 37)
        return pa.table(
            {
                "grp": pa.array(gs, pa.int64()),
                "x": pa.array(xs, pa.int64()),
                "y": pa.array(ys, pa.int64()),
            }
        )

    def metrics(g: pd.DataFrame) -> pd.DataFrame:
        pts = list({(int(x), int(y))
                    for x, y in zip(g["x"], g["y"])})
        hull = _hull(pts)
        h = len(hull)
        diam2 = 0
        for i in range(h):
            for j in range(i + 1, h):
                dx = hull[i][0] - hull[j][0]
                dy = hull[i][1] - hull[j][1]
                diam2 = max(diam2, dx * dx + dy * dy)
        # min-area rect: for each hull edge, width x extent along it
        best = None
        fh = [(Fraction(x), Fraction(y)) for x, y in hull]
        for i in range(h):
            ex = fh[(i + 1) % h][0] - fh[i][0]
            ey = fh[(i + 1) % h][1] - fh[i][1]
            L2 = ex * ex + ey * ey
            if L2 == 0:
                continue
            us = [(ex * p[0] + ey * p[1]) for p in fh]
            vs = [(ex * p[1] - ey * p[0]) for p in fh]
            area = (max(us) - min(us)) * (max(vs) - min(vs)) / L2
            if best is None or area < best:
                best = area
        best = best if best is not None else Fraction(0)
        return pd.DataFrame(
            {
                "grp": [int(g["grp"].iloc[0])],
                "hull_size": [h],
                "diam2": [int(diam2)],
                "rect_area_num": [int(best.numerator)],
                "rect_area_den": [int(best.denominator)],
            }
        )

    ds = ray.data.from_arrow(
        pa.table({"grp": pa.array(np.arange(n_groups, dtype=np.int64))})
    )
    out = (
        ds.map_batches(gen, batch_format="pyarrow")
        .groupby("grp")
        .map_groups(metrics, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("grp").reset_index(drop=True)
