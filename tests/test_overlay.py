"""Exact convex overlay (pipelines/overlay.py): clipping vs the
independent vertex-enumeration algorithm, closed-form cases, rational
exactness, disjoint/contained/partial configurations."""

from fractions import Fraction

import numpy as np
import pytest

from exactextractr_ray.pipelines.overlay import (
    _poly_fixture,
    convex_overlay_areas,
    intersection_area,
    intersection_area_reference,
)

SQUARE = [(0, 0), (4, 0), (4, 4), (0, 4)]


def test_closed_form_squares():
    # half-overlapping unit-scaled squares: area 8
    other = [(2, 0), (6, 0), (6, 4), (2, 4)]
    assert intersection_area(SQUARE, other) == Fraction(8)
    # disjoint
    assert intersection_area(SQUARE, [(10, 0), (12, 0), (12, 2),
                                      (10, 2)]) == 0
    # contained triangle: its own area 2
    tri = [(1, 1), (3, 1), (1, 3)]
    assert intersection_area(SQUARE, tri) == Fraction(2)
    # rotated square (diamond) over square: the classic octagon case
    diamond = [(2, -1), (5, 2), (2, 5), (-1, 2)]
    a = intersection_area(SQUARE, diamond)
    assert a == intersection_area_reference(SQUARE, diamond)
    assert Fraction(0) < a < Fraction(16)


def test_orientation_invariance():
    cw = SQUARE[::-1]
    tri = [(1, 1), (3, 1), (1, 3)]
    assert intersection_area(cw, tri[::-1]) == Fraction(2)


def test_rational_vertices_stay_exact():
    # edges crossing at non-integer points: result must be the exact
    # rational, not a float approximation
    a = [(0, 0), (3, 0), (3, 3), (0, 3)]
    b = [(1, -1), (4, 2), (1, 5), (-2, 2)]
    x = intersection_area(a, b)
    y = intersection_area_reference(a, b)
    assert x == y and x.denominator >= 1


def test_all_fixture_pairs_agree_both_algorithms():
    for i in range(0, 14, 3):
        for j in range(0, 14, 3):
            a = _poly_fixture(i)
            b = _poly_fixture(1000 + j)
            assert intersection_area(a, b) == \
                intersection_area_reference(a, b)


def test_pipeline_output(ray_session):
    df = convex_overlay_areas()
    assert len(df) > 50
    assert (df["area_num"] > 0).all() and (df["area_den"] > 0).all()
    # lowest terms
    from math import gcd

    assert all(gcd(int(n), int(d)) == 1
               for n, d in zip(df["area_num"], df["area_den"]))
    # spot-check one pair against the reference
    r = df.iloc[7]
    want = intersection_area_reference(
        _poly_fixture(int(r.a_id)), _poly_fixture(1000 + int(r.b_id))
    )
    assert Fraction(int(r.area_num), int(r.area_den)) == want


def test_minkowski_sum_dual_algorithm():
    from exactextractr_ray.pipelines.overlay import (
        minkowski_sum,
        minkowski_sum_reference,
        polygon_area2,
    )

    oct_ = [(2, 1), (1, 2), (-1, 2), (-2, 1), (-2, -1), (-1, -2),
            (1, -2), (2, -1)]
    for i in range(14):
        a = _poly_fixture(i)
        s1 = minkowski_sum(a, oct_)
        s2 = minkowski_sum_reference(a, oct_)
        assert set(s1) == set(s2)
        assert polygon_area2(s1) == polygon_area2(s2)
    # closed forms: square ⊕ square doubles each side (area 4x);
    # A ⊕ {0} == hull(A)
    sq = [(0, 0), (2, 0), (2, 2), (0, 2)]
    assert polygon_area2(minkowski_sum(sq, sq)) / 2 == Fraction(16)
    assert set(minkowski_sum(sq, [(0, 0)])) == set(sq)


def test_buffer_pipeline(ray_session):
    from exactextractr_ray.pipelines.overlay import buffered_overlay_areas

    df = buffered_overlay_areas()
    assert len(df) == 14
    # buffered hexagon by an octagon: at most 6+8 boundary edges
    assert (df["n_vertices"] <= 14).all() and (df["n_vertices"] >= 6).all()
    assert (df["area_num"] > 0).all()


def test_segment_intersection_join(ray_session):
    """Grid-bucket join with responsibility-cell dedup vs all-pairs
    brute force; predicate covers proper crossings, collinear overlaps
    and endpoint touches."""
    from exactextractr_ray.pipelines.overlay import (
        _seg_fixture,
        _segments_intersect,
        segment_intersection_join,
    )

    got = segment_intersection_join(n=120)
    want = [
        (i, j)
        for i in range(120)
        for j in range(i + 1, 120)
        if _segments_intersect(_seg_fixture(i), _seg_fixture(j))
    ]
    assert list(zip(got["a_id"], got["b_id"])) == want
    # predicate unit cases
    assert _segments_intersect((0, 0, 4, 0), (2, -1, 2, 1))  # crossing
    assert _segments_intersect((0, 0, 4, 0), (4, 0, 6, 2))   # touch
    assert _segments_intersect((0, 0, 4, 0), (2, 0, 6, 0))   # collinear
    assert not _segments_intersect((0, 0, 4, 0), (0, 1, 4, 1))
    assert not _segments_intersect((0, 0, 4, 0), (5, 0, 8, 0))


def test_hull_calipers(ray_session):
    """Diameter^2 vs brute force over ALL points; min-area rectangle vs
    brute force over hull-edge orientations; rect area <= bbox area."""
    from exactextractr_ray.pipelines.overlay import _hull, hull_calipers

    df = hull_calipers(n_groups=4)
    for _, row in df.iterrows():
        g = int(row["grp"])
        pts = {((g * 31 + i * 13) % 41, (g * 17 + i * 19) % 37)
               for i in range(40)}
        d2 = max((a[0] - b[0]) ** 2 + (a[1] - b[1]) ** 2
                 for a in pts for b in pts)
        assert int(row["diam2"]) == d2
        hull = _hull(list(pts))
        assert int(row["hull_size"]) == len(hull)
        # independent rect: same calipers theorem, recomputed here
        best = None
        fh = [(Fraction(x), Fraction(y)) for x, y in hull]
        h = len(fh)
        for i in range(h):
            ex = fh[(i + 1) % h][0] - fh[i][0]
            ey = fh[(i + 1) % h][1] - fh[i][1]
            L2 = ex * ex + ey * ey
            us = [ex * p[0] + ey * p[1] for p in fh]
            vs = [ex * p[1] - ey * p[0] for p in fh]
            area = (max(us) - min(us)) * (max(vs) - min(vs)) / L2
            best = area if best is None else min(best, area)
        got = Fraction(int(row["rect_area_num"]),
                       int(row["rect_area_den"]))
        assert got == best
        # axis-aligned bbox bounds it above
        xs = [p[0] for p in pts]
        ys = [p[1] for p in pts]
        assert got <= (max(xs) - min(xs)) * (max(ys) - min(ys))


def test_mann_whitney_u(ray_session):
    """MWU vs brute-force pairwise comparison, ties exact, the
    U_A + U_B = n_a*n_b invariant, shift detection."""
    import ray.data
    import pyarrow as pa

    from exactextractr_ray.stages.rank import mann_whitney_u

    rng = np.random.default_rng(6)
    a = rng.integers(0, 50, 80)
    b = rng.integers(10, 60, 70)  # shifted up
    t = pa.table(
        {
            "g": ["a"] * len(a) + ["b"] * len(b),
            "v": np.r_[a, b].astype(np.int64),
        }
    )
    ds = ray.data.from_arrow(t)
    df = mann_whitney_u(ds, "v", "g", "a", "b")
    u2 = int(df.iloc[0]["u2"])
    brute = sum(
        2 if x > y else (1 if x == y else 0) for x in a for y in b
    )
    assert u2 == brute
    dfb = mann_whitney_u(ds, "v", "g", "b", "a")
    assert u2 + int(dfb.iloc[0]["u2"]) == 2 * len(a) * len(b)
    # b is stochastically larger: its U exceeds half the pair mass
    assert int(dfb.iloc[0]["u2"]) > len(a) * len(b)


def test_ks_statistic(ray_session):
    """KS vs brute-force ECDF scan; identical samples give 0; disjoint
    supports give 1."""
    import ray.data
    import pyarrow as pa

    from exactextractr_ray.stages.rank import ks_statistic

    rng = np.random.default_rng(2)
    a = rng.integers(0, 40, 60)
    b = rng.integers(15, 55, 50)
    t = pa.table({"g": ["a"] * 60 + ["b"] * 50,
                  "v": np.r_[a, b].astype(np.int64)})
    df = ks_statistic(ray.data.from_arrow(t), "v", "g", "a", "b")
    vals = sorted(set(np.r_[a, b]))
    brute = max(
        abs((a <= v).sum() * len(b) - (b <= v).sum() * len(a))
        for v in vals
    )
    assert int(df.iloc[0]["ks_num"]) == brute
    assert df.iloc[0]["ks"] == brute / (60 * 50)

    same = pa.table({"g": ["a", "b"] * 30,
                     "v": np.repeat(np.arange(30), 2).astype(np.int64)})
    d0 = ks_statistic(ray.data.from_arrow(same), "v", "g", "a", "b")
    assert int(d0.iloc[0]["ks_num"]) == 0

    dis = pa.table({"g": ["a"] * 5 + ["b"] * 5,
                    "v": np.r_[np.arange(5), 100 + np.arange(5)]
                    .astype(np.int64)})
    d1 = ks_statistic(ray.data.from_arrow(dis), "v", "g", "a", "b")
    assert d1.iloc[0]["ks"] == 1.0


def test_spearman_rho(ray_session):
    """Doubled-rank Spearman vs pandas rank(average) + corrcoef (the
    independent reference; scipy absent), perfect monotone -> 1,
    reversal -> -1."""
    import ray.data
    import pandas as pd
    import pyarrow as pa

    from exactextractr_ray.stages.rank import spearman_rho

    rng = np.random.default_rng(1)
    x = rng.integers(0, 100, 500).astype(np.int64)
    y = (x * 3 + rng.integers(0, 40, 500)).astype(np.int64)
    df = spearman_rho(
        ray.data.from_arrow(pa.table({"x": x, "y": y})), "x", "y"
    )
    ref = float(np.corrcoef(pd.Series(x).rank(method="average"),
                            pd.Series(y).rank(method="average"))[0, 1])
    assert abs(df.iloc[0]["rho"] - ref) < 1e-12
    up = np.arange(60, dtype=np.int64)
    assert spearman_rho(
        ray.data.from_arrow(pa.table({"x": up, "y": up * up})), "x", "y"
    ).iloc[0]["rho"] == pytest.approx(1.0, abs=1e-15)
    assert spearman_rho(
        ray.data.from_arrow(pa.table({"x": up, "y": -up})), "x", "y"
    ).iloc[0]["rho"] == pytest.approx(-1.0, abs=1e-15)


def test_kendall_tau_b(ray_session):
    """Merge inversion count vs brute force (with heavy ties); closed
    forms: monotone -> 1, reversal -> -1."""
    import ray.data
    import pyarrow as pa

    from exactextractr_ray.stages.rank import (
        _count_inversions,
        kendall_tau_b,
    )

    rng = np.random.default_rng(9)
    y = rng.integers(0, 20, 300)
    brute_inv = sum(
        1 for i in range(300) for j in range(i + 1, 300)
        if y[i] > y[j]
    )
    assert _count_inversions(y) == brute_inv

    x = rng.integers(0, 25, 200).astype(np.int64)
    yy = (x + rng.integers(0, 10, 200)).astype(np.int64)
    df = kendall_tau_b(
        ray.data.from_arrow(pa.table({"x": x, "y": yy})), "x", "y"
    )
    C = D = 0
    for i in range(200):
        for j in range(i + 1, 200):
            s = (x[i] - x[j]) * (yy[i] - yy[j])
            C += s > 0
            D += s < 0
    assert int(df.iloc[0]["concordant"]) == C
    assert int(df.iloc[0]["discordant"]) == D

    up = np.arange(50, dtype=np.int64)
    t1 = kendall_tau_b(
        ray.data.from_arrow(pa.table({"x": up, "y": up * 3})), "x", "y"
    )
    assert t1.iloc[0]["tau_b"] == pytest.approx(1.0, abs=1e-15)
    t2 = kendall_tau_b(
        ray.data.from_arrow(pa.table({"x": up, "y": -up})), "x", "y"
    )
    assert t2.iloc[0]["tau_b"] == pytest.approx(-1.0, abs=1e-15)


def test_benford_and_psi(ray_session):
    import ray.data
    import pyarrow as pa

    from exactextractr_ray.stages.profile import benford_digits, psi_buckets

    rng = np.random.default_rng(1)
    v = (np.exp(rng.uniform(0, 10, 2000))).astype(np.int64) + 1
    df = benford_digits(ray.data.from_arrow(pa.table({"v": v})), "v")
    assert len(df) == 9 and int(df["cnt"].sum()) == 2000
    # log-uniform data follows Benford: digit 1 dominates, shares decay
    assert int(df.iloc[0]["cnt"]) == int(df["cnt"].max())
    assert df.iloc[0]["expected_ppm"] == 301030
    # brute-force digit counts
    brute = np.zeros(10, np.int64)
    for x in v:
        brute[int(str(int(x))[0])] += 1
    assert (df["cnt"].to_numpy() == brute[1:]).all()

    g = ["a"] * 1000 + ["b"] * 1000
    vals = np.r_[rng.integers(0, 100, 1000),
                 rng.integers(20, 120, 1000)].astype(np.int64)
    p = psi_buckets(
        ray.data.from_arrow(pa.table({"g": g, "v": vals})),
        "v", "g", "a", "b", edges=[25, 50, 75, 100],
    )
    assert int(p["ca"].sum()) == 1000 and int(p["cb"].sum()) == 1000
    # psi_term matches the definition where both sides populated
    na, nb = 1000.0, 1000.0
    for _, r in p.iterrows():
        if r["ca"] > 0 and r["cb"] > 0:
            pa_, pb_ = r["ca"] / na, r["cb"] / nb
            assert r["psi_term"] == (pa_ - pb_) * np.log(pa_ / pb_)
        else:
            assert np.isnan(r["psi_term"])
