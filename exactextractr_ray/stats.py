"""Mergeable coverage-weighted aggregation state (RasterStats analog).

Semantics mirror the reference's RasterStats
(/root/reference/src/exactextract/src/raster_stats.h:30-493):

* a cell participates iff its coverage fraction > 0 AND its value is not
  NODATA/NaN (raster_stats.h:96-110);
* an NA weight is processed as NaN, poisoning the weighted sums
  (raster_stats.h:101-110) so weighted stats come out NaN;
* running sums: sum_ci, sum_xici, sum_ciwi, sum_xiciwi; min/max; two
  West-variance accumulators (variance.h:21-69, West 1979 WV2); a value ->
  (sum_ci, sum_ciwi) frequency map for the stats that need stored values
  (mode/minority/variety/median/quantile/frac — raster_utils.h:63-73).

What the reference does NOT have — and this rebuild adds — is ``merge``:
partial states computed per tile inside Ray Data tasks are combined in a
``groupby(zone_id)`` shuffle. Sums/min/max/freq merge trivially; the West
variance accumulators merge with the standard Chan parallel formula
(t_ab = t_a + t_b + (mean_b-mean_a)^2 * W_a W_b / (W_a + W_b)).

Batch processing is vectorized numpy — within a batch the variance update
uses the two-pass batch formula, then batches merge via Chan; results agree
with the reference's sequential West updates to ~1e-12 relative (validated
against the reference's published golden values in tests).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

#: NODATA sentinel for integer-stored tile values (mirrors synth.INT_NODATA;
#: defined here too so stats.py stays dependency-free). Integer tiles are the
#: memory-bandwidth path: int16 cells move 2 bytes instead of 8 through the
#: object store and the CPU caches, and the interior fast path accumulates
#: them in int64 (exact, and bit-identical to float64 accumulation for any
#: values below 2^53 — which int16 guarantees by construction).
INT_NODATA = -32768

#: stats that require the value->coverage frequency map, mirroring
#: requires_stored_values (/root/reference/src/raster_utils.h:63-73)
STORED_VALUE_STATS = {
    "mode",
    "majority",
    "minority",
    "variety",
    "median",
    "quantile",
    "frac",
    "weighted_frac",
    "gini",
}

ALL_STATS = [
    "count",
    "sum",
    "mean",
    "min",
    "max",
    "median",
    "quantile",
    "mode",
    "majority",
    "minority",
    "variety",
    "variance",
    "stdev",
    "coefficient_of_variation",
    "weighted_mean",
    "weighted_sum",
    "weighted_count",
    "weighted_fraction",
    "weighted_variance",
    "weighted_stdev",
    "frac",
    "weighted_frac",
    "gini",
]


@dataclass
class VarState:
    """West/Chan mergeable weighted-variance accumulator."""

    sum_w: float = 0.0
    mean: float = 0.0
    t: float = 0.0

    def process_batch(self, x: np.ndarray, w: np.ndarray) -> None:
        m = w != 0.0
        if not np.any(m):
            return
        x, w = x[m], w[m]
        W = float(np.sum(w))
        mu = float(np.sum(x * w)) / W
        t = float(np.sum(w * (x - mu) ** 2))
        self.merge(VarState(W, mu, t))

    def merge(self, other: "VarState") -> None:
        if other.sum_w == 0.0:
            return
        if self.sum_w == 0.0:
            self.sum_w, self.mean, self.t = other.sum_w, other.mean, other.t
            return
        W = self.sum_w + other.sum_w
        d = other.mean - self.mean
        self.t = self.t + other.t + d * d * self.sum_w * other.sum_w / W
        self.mean = self.mean + d * other.sum_w / W
        self.sum_w = W

    def variance(self) -> float:
        return self.t / self.sum_w if self.sum_w > 0 else float("nan")

    def stdev(self) -> float:
        v = self.variance()
        return math.sqrt(v) if v == v else float("nan")


@dataclass
class RasterStats:
    """Mergeable per-(zone, layer) aggregation state."""

    store_values: bool = False
    sum_ci: float = 0.0
    sum_xici: float = 0.0
    sum_ciwi: float = 0.0
    sum_xiciwi: float = 0.0
    # exact second moments (not in the reference; enable the moment-form
    # variance used by the SQL oracles — exact for integer-valued rasters)
    sum_x2ci: float = 0.0
    sum_x2ciwi: float = 0.0
    min: float = math.inf
    max: float = -math.inf
    var: VarState = field(default_factory=VarState)
    wvar: VarState = field(default_factory=VarState)
    # frequency map: value -> [sum_ci, sum_ciwi]
    freq: dict = field(default_factory=dict)

    def process(
        self,
        values: np.ndarray,
        cov: np.ndarray | None,
        weights: np.ndarray | None = None,
        need_minmax: bool = True,
    ) -> None:
        """Vectorized equivalent of repeated process_value calls
        (raster_stats.h:113-139). NaN values are NODATA and skipped; NaN
        weights poison the weighted sums.

        ``cov=None`` is the UNIT-COVERAGE fast path for fully-interior tiles
        (every cell covered with fraction 1.0): no coverage array is built or
        scanned, cutting the stage's memory traffic roughly in half — the
        stage is memory-bandwidth-bound at high core counts, so array passes
        are the cost model. For the integer-exact rasters the oracles use,
        the fast path is value-identical to an explicit all-ones cov (sums
        of the same f64 values); for arbitrary float rasters it may differ
        from the explicit-cov path only in summation-order ulps.

        Implemented with where-masked whole-array kernels (no boolean-index
        copies) and moment-form batch variance feeding the Chan merge."""
        vraw = np.asarray(values).ravel()
        int_in = vraw.dtype.kind in "iu"
        if (
            cov is None
            and int_in
            and vraw.dtype.itemsize <= 2
            and (weights is None or (
                np.asarray(weights).dtype.kind in "iu"
                and np.asarray(weights).dtype.itemsize <= 2
            ))
        ):
            # INTEGER UNIT-COVERAGE FAST PATH (int16 tile storage): no
            # float64 materialization of the tile at all. int64 sums of
            # int16 values (and their squares, < 2^30 each) are exact and
            # equal the float64 accumulation bit-for-bit (both are the same
            # integer < 2^53), so every downstream stat is identical to the
            # float path. NODATA is the INT_NODATA sentinel. Restricted to
            # <=16-bit ints so the square-sum provably cannot overflow.
            self._process_int_unit(vraw, weights, need_minmax)
            return
        if cov is None:
            # unit path additionally avoids the float64 cast pass: float32
            # storage stays float32 through the masks (f32 -> f64 conversion
            # is exact, and the reductions accumulate in f64 via dtype=)
            v = vraw
            if int_in:
                v = v.astype(np.float64)
                v[vraw == INT_NODATA] = np.nan
            elif v.dtype not in (np.float32, np.float64):
                v = v.astype(np.float64)
        else:
            v = vraw.astype(np.float64) if vraw.dtype != np.float64 else vraw
            if int_in:
                v = v.copy() if v is vraw else v
                v[vraw == INT_NODATA] = np.nan
        nan = np.isnan(v)
        if cov is None:
            cm = None
            W = float(v.size - np.count_nonzero(nan))
        else:
            c = np.asarray(cov, dtype=np.float64).ravel()
            cm = np.where(nan | (c <= 0.0), 0.0, c)
            W = float(np.sum(cm))
        if W <= 0.0:
            return
        v0 = np.where(nan, v.dtype.type(0.0), v)
        # BLAS dot / single-pass einsum: no materialized product temporaries
        if cm is None:
            s1 = float(np.sum(v0, dtype=np.float64))
            s2 = float(np.einsum("i,i->", v0, v0, dtype=np.float64))
        else:
            s1 = float(np.dot(v0, cm))
            s2 = float(np.einsum("i,i,i->", v0, v0, cm))
        self.sum_ci += W
        self.sum_xici += s1
        self.sum_x2ci += s2
        mu = s1 / W
        self.var.merge(VarState(W, mu, max(0.0, s2 - s1 * mu)))
        if need_minmax:
            # extra array passes — callers that don't request min/max skip
            # them; the unit path reads v directly (covered iff non-NaN)
            vm = v if cm is None else np.where(cm > 0.0, v, np.nan)
            self.min = min(self.min, float(np.nanmin(vm)))
            self.max = max(self.max, float(np.nanmax(vm)))

        if weights is None:
            ciwi = cm
            ws1, ws2, WW = s1, s2, W
            self.sum_ciwi += W
            self.sum_xiciwi += s1
            self.sum_x2ciwi += s2
        else:
            w = np.asarray(weights, dtype=np.float64).ravel()
            # zero out excluded cells BEFORE multiplying so a NaN weight on an
            # excluded cell cannot poison the sums (0 * nan = nan otherwise)
            if cm is None:
                ciwi = np.where(nan, 0.0, w)
            else:
                wm = np.where(cm > 0.0, w, 0.0)
                ciwi = cm * wm
            WW = float(np.sum(ciwi))
            ws1 = float(np.dot(v0, ciwi))
            ws2 = float(np.einsum("i,i,i->", v0, v0, ciwi))
            self.sum_ciwi += WW
            self.sum_xiciwi += ws1
            self.sum_x2ciwi += ws2
        # NaN moments poison the weighted variance too, matching the
        # reference where process(x, nan) corrupts the accumulator
        if WW != 0.0:
            wmu = ws1 / WW
            t = ws2 - ws1 * wmu
            self.wvar.merge(VarState(WW, wmu, t if t == t and t > 0.0 else (t if t != t else 0.0)))

        if self.store_values:
            m = ~nan if cm is None else cm > 0.0
            x = v[m]
            cc = np.ones(len(x)) if cm is None else cm[m]
            cw = cc if weights is None else ciwi[m]
            uq, inv = np.unique(x, return_inverse=True)
            csum = np.bincount(inv, weights=cc, minlength=len(uq))
            wsum = np.bincount(inv, weights=cw, minlength=len(uq))
            for val, cs, wsv in zip(uq.tolist(), csum.tolist(), wsum.tolist()):
                ent = self.freq.get(val)
                if ent is None:
                    self.freq[val] = [cs, wsv]
                else:
                    ent[0] += cs
                    ent[1] += wsv

    def _process_int_unit(
        self,
        v: np.ndarray,
        weights: np.ndarray | None,
        need_minmax: bool,
    ) -> None:
        """Unit-coverage accumulation for <=16-bit integer storage.

        Every accumulator is an int64 sum of products of <=16-bit ints —
        exact, and (being integers < 2^53) converts to float64 without
        rounding, so the resulting state is bit-identical to the float
        path's. This is the DRAM lever: the tile is read once at 2 B/cell
        and never expanded to 8 B/cell.
        """
        nodata = v == INT_NODATA
        n_nodata = int(np.count_nonzero(nodata))
        W = float(v.size - n_nodata)
        if W <= 0.0:
            return
        v0 = np.where(nodata, v.dtype.type(0), v)
        s1 = float(int(np.sum(v0, dtype=np.int64)))
        s2 = float(int(np.einsum("i,i->", v0, v0, dtype=np.int64)))
        self.sum_ci += W
        self.sum_xici += s1
        self.sum_x2ci += s2
        mu = s1 / W
        self.var.merge(VarState(W, mu, max(0.0, s2 - s1 * mu)))
        if need_minmax:
            if n_nodata:
                vmax_sent = np.iinfo(v.dtype).max
                self.min = min(
                    self.min,
                    float(np.min(np.where(nodata, v.dtype.type(vmax_sent), v))),
                )
            else:
                self.min = min(self.min, float(np.min(v)))
            # INT_NODATA is the dtype minimum, so max is sentinel-immune
            self.max = max(self.max, float(np.max(v0)))
        if weights is None:
            self.sum_ciwi += W
            self.sum_xiciwi += s1
            self.sum_x2ciwi += s2
            WW, ws1, ws2 = W, s1, s2
        else:
            w = np.asarray(weights).ravel()
            ciwi = np.where(nodata, w.dtype.type(0), w)
            WW = float(int(np.sum(ciwi, dtype=np.int64)))
            ws1 = float(int(np.einsum("i,i->", v0, ciwi, dtype=np.int64)))
            ws2 = float(int(np.einsum("i,i,i->", v0, v0, ciwi, dtype=np.int64)))
            self.sum_ciwi += WW
            self.sum_xiciwi += ws1
            self.sum_x2ciwi += ws2
        if WW != 0.0:
            wmu = ws1 / WW
            t = ws2 - ws1 * wmu
            self.wvar.merge(VarState(WW, wmu, t if t > 0.0 else 0.0))
        if self.store_values:
            x = v0[~nodata].astype(np.float64)
            uq, inv = np.unique(x, return_inverse=True)
            csum = np.bincount(inv, minlength=len(uq)).astype(np.float64)
            if weights is None:
                wsum = csum
            else:
                wsum = np.bincount(
                    inv, weights=ciwi[~nodata].astype(np.float64),
                    minlength=len(uq),
                )
            for val, cs, wsv in zip(uq.tolist(), csum.tolist(), wsum.tolist()):
                ent = self.freq.get(val)
                if ent is None:
                    self.freq[val] = [cs, wsv]
                else:
                    ent[0] += cs
                    ent[1] += wsv

    def merge(self, other: "RasterStats") -> None:
        self.sum_ci += other.sum_ci
        self.sum_xici += other.sum_xici
        self.sum_ciwi += other.sum_ciwi
        self.sum_xiciwi += other.sum_xiciwi
        self.sum_x2ci += other.sum_x2ci
        self.sum_x2ciwi += other.sum_x2ciwi
        self.min = min(self.min, other.min)
        self.max = max(self.max, other.max)
        self.var.merge(other.var)
        self.wvar.merge(other.wvar)
        for v, (cs, ws) in other.freq.items():
            ent = self.freq.get(v)
            if ent is None:
                self.freq[v] = [cs, ws]
            else:
                ent[0] += cs
                ent[1] += ws

    # ---------- finalizers (raster_stats.h definitions) ----------

    def count(self) -> float:
        return self.sum_ci

    def sum(self) -> float:
        return self.sum_xici

    def mean(self) -> float:
        return self.sum_xici / self.sum_ci if self.sum_ci > 0 else float("nan")

    def stat_min(self) -> float:
        return self.min if self.sum_ci > 0 else float("nan")

    def stat_max(self) -> float:
        return self.max if self.sum_ci > 0 else float("nan")

    def weighted_sum(self) -> float:
        return self.sum_xiciwi

    def weighted_count(self) -> float:
        """Sum of (coverage x weight) over covered cells
        (raster_stats.h:266-274)."""
        return self.sum_ciwi

    def weighted_fraction(self) -> float:
        """weighted_sum / sum — meaningful when weights are in [0, 1]
        (raster_stats.h:162-168)."""
        s = self.sum()
        return self.weighted_sum() / s if s != 0 else float("nan")

    def count_value(self, value: float):
        """Coverage-weighted count of cells equal to ``value``; None when
        the value was never seen (raster_stats.h:362-373)."""
        ent = self.freq.get(value)
        return None if ent is None else ent[0]

    def weighted_count_value(self, value: float):
        """Sum of (coverage x weight) of cells equal to ``value``; None
        when never seen (raster_stats.h:375-383)."""
        ent = self.freq.get(value)
        return None if ent is None else ent[1]

    def frac_value(self, value: float):
        """count(v) / count(); None when never seen
        (raster_stats.h:385-391)."""
        c = self.count_value(value)
        return None if c is None else c / self.count()

    def weighted_mean(self) -> float:
        return (
            self.sum_xiciwi / self.sum_ciwi if self.sum_ciwi != 0 else float("nan")
        )

    def variance(self) -> float:
        return self.var.variance()

    def stdev(self) -> float:
        return self.var.stdev()

    def coefficient_of_variation(self) -> float:
        v = self.var
        return v.stdev() / v.mean if v.sum_w > 0 else float("nan")

    def weighted_variance(self) -> float:
        return self.wvar.variance()

    def weighted_stdev(self) -> float:
        return self.wvar.stdev()

    def variance_exact(self) -> float:
        """Moment-form population variance from exact sums:
        (sum(x^2 c) - sum(x c)^2 / sum(c)) / sum(c). Bit-reproducible for
        integer-valued rasters with binary-fraction coverages; used by the
        SQL-oracle queries (named 'variance' keeps the reference's West
        accumulator)."""
        if self.sum_ci <= 0:
            return float("nan")
        return (self.sum_x2ci - self.sum_xici * self.sum_xici / self.sum_ci) / self.sum_ci

    def variety(self) -> int:
        return len(self.freq)

    def mode(self) -> float:
        """Value with max coverage; ties -> greatest value
        (raster_stats.h:170-186)."""
        if not self.freq:
            return float("nan")
        return max(self.freq.items(), key=lambda kv: (kv[1][0], kv[0]))[0]

    def minority(self) -> float:
        """Value with min coverage; ties -> smallest value
        (raster_stats.h:393-403)."""
        if not self.freq:
            return float("nan")
        return min(self.freq.items(), key=lambda kv: (kv[1][0], kv[0]))[0]

    def quantile(self, q: float) -> float:
        """The reference's weighted quantile over the (distinct value ->
        sum_ci) map (/root/reference/src/exactextract/src/
        weighted_quantiles.cpp:20-70): sort by x; s_0 = 0,
        s_i = i*w_i + (n-1)*cumsum_{i-1}; target q * sum_w * (n-1);
        linear interpolation on s."""
        if self.sum_ci == 0 or not self.freq:
            return float("nan")
        if not (0.0 <= q <= 1.0):
            raise ValueError("Quantile must be between 0 and 1.")
        xs = np.array(sorted(self.freq.keys()))
        ws = np.array([self.freq[x][0] for x in xs.tolist()])
        n = len(xs)
        sum_w = float(ws.sum())
        if n == 1:
            return float(xs[0])
        cumsum = np.cumsum(ws)
        s = np.empty(n)
        s[0] = 0.0
        idx = np.arange(1, n)
        s[1:] = idx * ws[1:] + (n - 1) * cumsum[:-1]
        target = q * sum_w * (n - 1)
        right = int(np.searchsorted(s, target, side="right"))
        left = right - 1
        if right >= n:
            return float(xs[left])
        return float(
            xs[left]
            + (target - s[left]) * (xs[right] - xs[left]) / (s[right] - s[left])
        )

    def median(self) -> float:
        return self.quantile(0.5)

    def frac(self) -> dict:
        """value -> sum_ci[x=v]/sum_ci (raster_stats.h:281-289)."""
        if self.sum_ci == 0:
            return {}
        return {v: e[0] / self.sum_ci for v, e in self.freq.items()}

    def weighted_frac(self) -> dict:
        """value -> sum_ciwi[x=v]/sum_ciwi (raster_stats.h:296-304)."""
        if self.sum_ciwi == 0:
            return {}
        return {v: e[1] / self.sum_ciwi for v, e in self.freq.items()}

    def gini(self) -> float:
        """Gini impurity of the coverage-weighted value distribution:
        1 - sum_v (C_v / C)^2 with C_v the per-value coverage sum. Not a
        reference stat — a categorical-diversity measure for curation
        pipelines. Exact for dyadic coverages (each C_v and C_v^2 stays
        representable in f64); keys are summed in sorted order so the
        value is independent of partial-merge order."""
        if self.sum_ci == 0:
            return math.nan
        s2 = 0.0
        for v in sorted(self.freq):
            w = self.freq[v][0]
            s2 += w * w
        return 1.0 - s2 / (self.sum_ci * self.sum_ci)

    def result(self, stat: str, quantiles: list[float] | None = None):
        if stat == "count":
            return self.count()
        if stat == "sum":
            return self.sum()
        if stat == "mean":
            return self.mean()
        if stat == "min":
            return self.stat_min()
        if stat == "max":
            return self.stat_max()
        if stat == "median":
            return self.median()
        if stat == "quantile":
            return [self.quantile(q) for q in (quantiles or [0.5])]
        if stat in ("mode", "majority"):
            return self.mode()
        if stat == "minority":
            return self.minority()
        if stat == "variety":
            return float(self.variety())
        if stat == "variance":
            return self.variance()
        if stat == "variance_exact":
            return self.variance_exact()
        if stat == "stdev":
            return self.stdev()
        if stat == "coefficient_of_variation":
            return self.coefficient_of_variation()
        if stat == "weighted_mean":
            return self.weighted_mean()
        if stat == "weighted_sum":
            return self.weighted_sum()
        if stat == "weighted_count":
            return self.weighted_count()
        if stat == "weighted_fraction":
            return self.weighted_fraction()
        if stat == "weighted_variance":
            return self.weighted_variance()
        if stat == "weighted_stdev":
            return self.weighted_stdev()
        if stat == "frac":
            return self.frac()
        if stat == "weighted_frac":
            return self.weighted_frac()
        if stat == "gini":
            return self.gini()
        raise ValueError(f"unknown stat {stat!r}")

    # ---------- (de)serialization for shuffling partial states ----------

    def to_row(self) -> dict:
        """Flatten into plain-typed columns for an Arrow partial-stats row."""
        return {
            "sum_ci": self.sum_ci,
            "sum_xici": self.sum_xici,
            "sum_ciwi": self.sum_ciwi,
            "sum_xiciwi": self.sum_xiciwi,
            "sum_x2ci": self.sum_x2ci,
            "sum_x2ciwi": self.sum_x2ciwi,
            "vmin": self.min if self.sum_ci > 0 else math.inf,
            "vmax": self.max if self.sum_ci > 0 else -math.inf,
            "var_w": self.var.sum_w,
            "var_mean": self.var.mean,
            "var_t": self.var.t,
            "wvar_w": self.wvar.sum_w,
            "wvar_mean": self.wvar.mean,
            "wvar_t": self.wvar.t,
            "freq_values": list(self.freq.keys()),
            "freq_ci": [e[0] for e in self.freq.values()],
            "freq_ciwi": [e[1] for e in self.freq.values()],
        }

    @staticmethod
    def from_row(row: dict, store_values: bool = False) -> "RasterStats":
        st = RasterStats(store_values=store_values)
        st.sum_ci = float(row["sum_ci"])
        st.sum_xici = float(row["sum_xici"])
        st.sum_ciwi = float(row["sum_ciwi"])
        st.sum_xiciwi = float(row["sum_xiciwi"])
        st.sum_x2ci = float(row.get("sum_x2ci", 0.0))
        st.sum_x2ciwi = float(row.get("sum_x2ciwi", 0.0))
        st.min = float(row["vmin"])
        st.max = float(row["vmax"])
        st.var = VarState(float(row["var_w"]), float(row["var_mean"]), float(row["var_t"]))
        st.wvar = VarState(
            float(row["wvar_w"]), float(row["wvar_mean"]), float(row["wvar_t"])
        )
        fv = row.get("freq_values")
        if fv is not None and len(fv):
            st.freq = {
                float(v): [float(c), float(w)]
                for v, c, w in zip(fv, row["freq_ci"], row["freq_ciwi"])
            }
        return st


PARTIAL_COLUMNS = [
    "sum_ci",
    "sum_xici",
    "sum_ciwi",
    "sum_xiciwi",
    "sum_x2ci",
    "sum_x2ciwi",
    "vmin",
    "vmax",
    "var_w",
    "var_mean",
    "var_t",
    "wvar_w",
    "wvar_mean",
    "wvar_t",
    "freq_values",
    "freq_ci",
    "freq_ciwi",
]
