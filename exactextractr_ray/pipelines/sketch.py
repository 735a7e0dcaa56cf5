"""Approximate distinct-value zonal statistics (KMV sketch) — the 100-TB
scale path for `variety` on continuous-valued rasters.

The reference (and this repo's exact pipelines) computes `variety` /
`median` / `frac` from an EXACT per-zone frequency map
(raster_stats.h:409-411): correct, but the map is unbounded when cell
values are continuous — the one documented pressure point of the exact
design at extreme scale. This module provides the standard bounded-state
alternative: a k-minimum-values sketch per (zone, tile), ~8k bytes,
mergeable by union+truncate, with relative error ~ 1/sqrt(k).

This is intentionally BEYOND the reference (which has no sketches anywhere)
and is kept separate from the exact `exact_extract` so the reference's
exact-distinct semantics stay the default.

Estimator: with U = 2^64 and h_(k) the k-th smallest distinct 64-bit hash,
D ≈ (k-1) * U / h_(k); exact when fewer than k distinct hashes were seen.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ..grid import Box, Grid
from ..sources.zones import ZoneSet, parse_zone_table
from ..util import cached_stage
from .zonal import _prune_tiles_to_zones, zone_coverage

_U64 = np.uint64


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over uint64 (wrapping arithmetic)."""
    with np.errstate(over="ignore"):
        z = (x + _U64(0x9E3779B97F4A7C15)).astype(_U64)
        z = ((z ^ (z >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)).astype(_U64)
        z = ((z ^ (z >> _U64(27))) * _U64(0x94D049BB133111EB)).astype(_U64)
        return (z ^ (z >> _U64(31))).astype(_U64)


def _value_hashes(vals: np.ndarray, hasher: str = "splitmix64") -> np.ndarray:
    """64-bit hashes of float64 cell values.

    ``splitmix64`` (default): bit-pattern based, vectorized — equal values
    hash equally, -0.0 folds onto 0.0; use for continuous rasters.
    ``md5i``: md5 of the integer value's decimal text (top 16 hex chars) —
    SQL-reproducible (``CAST(('0x' || substr(md5(...)),1,16) AS UBIGINT)``),
    valid for integer-valued rasters; used by the bit-exact oracle."""
    v = np.asarray(vals, dtype=np.float64)
    if hasher == "md5i":
        import hashlib

        return np.array(
            [
                int(hashlib.md5(str(int(x)).encode()).hexdigest()[:16], 16)
                for x in v
            ],
            dtype=np.uint64,
        )
    v = v + 0.0  # -0.0 -> 0.0
    return _splitmix64(v.view(np.uint64))


def kmv_estimate(hashes: np.ndarray, k: int) -> float:
    """Distinct-count estimate from a merged set of minimum hashes."""
    h = np.unique(hashes)
    if len(h) < k:
        return float(len(h))
    kth = float(h[k - 1]) + 1.0  # +1: hashes are in [0, 2^64)
    return (k - 1) * (2.0 ** 64) / kth


class ZonalKMVPartial:
    """Tile -> per-zone k-minimum-values partial rows (bounded state)."""

    def __init__(
        self, zones_ref, grid_dict: dict, value_layer: str, k: int,
        hasher: str = "splitmix64",
    ):
        zones = ray.get(zones_ref) if not isinstance(zones_ref, ZoneSet) else zones_ref
        self.zones = zones
        self.grid = Grid.from_dict(grid_dict)
        self.value_layer = value_layer
        self.k = k
        self.hasher = hasher

    def __call__(self, batch: pa.Table) -> pa.Table:
        layers = batch.column("layer").to_pylist()
        tile_ids = batch.column("tile_id").to_numpy()
        row0s = batch.column("row0").to_numpy()
        col0s = batch.column("col0").to_numpy()
        ths = batch.column("th").to_numpy()
        tws = batch.column("tw").to_numpy()
        values_col = batch.column("values")

        out_zone: list[int] = []
        out_h: list[list[int]] = []
        for i, lay in enumerate(layers):
            if lay != self.value_layer:
                continue
            row0, col0 = int(row0s[i]), int(col0s[i])
            th, tw = int(ths[i]), int(tws[i])
            tile_grid = self.grid.subgrid(row0, col0, th, tw)
            zidx = self.zones.intersecting(tile_grid.extent)
            if len(zidx) == 0:
                continue
            vals = np.asarray(values_col[i].values, dtype=np.float64).reshape(
                th, tw
            )
            for zi in zidx:
                e = self.zones.envelopes[zi]
                sub = tile_grid.crop_to_box(Box(e[0], e[1], e[2], e[3]))
                if sub.empty():
                    continue
                cov = zone_coverage(sub, self.zones.parts[zi])
                r0 = sub.row_offset(tile_grid)
                c0 = sub.col_offset(tile_grid)
                v = vals[r0 : r0 + sub.nrow, c0 : c0 + sub.ncol][cov > 0.0]
                v = v[~np.isnan(v)]
                if len(v) == 0:
                    continue
                h = np.unique(_value_hashes(np.unique(v), self.hasher))[: self.k]
                out_zone.append(int(self.zones.zone_ids[zi]))
                # int64 view keeps Arrow happy; bit pattern preserved
                out_h.append(h.view(np.int64).tolist())
        return pa.table(
            {
                "zone_id": pa.array(out_zone, pa.int64()),
                "kmv": pa.array(out_h, pa.list_(pa.int64())),
            }
        )


def zonal_variety_approx(
    raster,
    zones: pa.Table,
    k: int = 1024,
    value_layer: str = "value",
    hasher: str = "splitmix64",
) -> pd.DataFrame:
    """Approximate per-zone distinct-value count, bounded memory.

    One row per zone: (zone_id, variety_est, exact) — ``exact`` is True
    when fewer than k distinct hashes were observed (the estimate is then
    the exact variety). Partial rows are at most k*8 bytes per (zone, tile)
    regardless of how many distinct values the tile holds."""
    zset = parse_zone_table(zones)
    zones_ref = ray.put(zset)
    partials = _prune_tiles_to_zones(raster, zset).map_batches(
        cached_stage(
            ZonalKMVPartial, zones_ref, raster.grid.to_dict(), value_layer, k,
            hasher,
        ),
        batch_format="pyarrow",
        batch_size=None,
    )

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        merged = np.unique(
            np.concatenate(
                [np.asarray(x, dtype=np.int64).view(np.uint64) for x in g["kmv"]]
            )
        )[:k]
        est = kmv_estimate(merged, k)
        return pd.DataFrame(
            {
                "zone_id": [int(g["zone_id"].iloc[0])],
                "variety_est": [est],
                "exact": [len(merged) < k],
            }
        )

    res = (
        partials.groupby("zone_id")
        .map_groups(finalize, batch_format="pandas")
        .to_pandas()
    )
    return res.sort_values("zone_id").reset_index(drop=True)


class ZonalHistPartial:
    """Tile -> per-zone fixed-bin coverage histogram (bounded state).

    The bounded-state companion to the KMV sketch for the OTHER unbounded
    exact-freq-map consumer: median/quantile on continuous rasters. State is
    exactly ``bins`` float64s per (zone, tile) regardless of distinct
    values; histograms merge by addition; quantiles interpolate uniformly
    within the selected bin (error <= bin width)."""

    def __init__(
        self, zones_ref, grid_dict: dict, value_layer: str,
        bins: int, vmin: float, vmax: float,
    ):
        zones = ray.get(zones_ref) if not isinstance(zones_ref, ZoneSet) else zones_ref
        self.zones = zones
        self.grid = Grid.from_dict(grid_dict)
        self.value_layer = value_layer
        self.bins = bins
        self.vmin = float(vmin)
        self.vmax = float(vmax)
        self.binw = (self.vmax - self.vmin) / bins

    def __call__(self, batch: pa.Table) -> pa.Table:
        layers = batch.column("layer").to_pylist()
        row0s = batch.column("row0").to_numpy()
        col0s = batch.column("col0").to_numpy()
        ths = batch.column("th").to_numpy()
        tws = batch.column("tw").to_numpy()
        values_col = batch.column("values")

        out_zone: list[int] = []
        out_hist: list[list[float]] = []
        for i, lay in enumerate(layers):
            if lay != self.value_layer:
                continue
            row0, col0 = int(row0s[i]), int(col0s[i])
            th, tw = int(ths[i]), int(tws[i])
            tile_grid = self.grid.subgrid(row0, col0, th, tw)
            zidx = self.zones.intersecting(tile_grid.extent)
            if len(zidx) == 0:
                continue
            vals = np.asarray(values_col[i].values, dtype=np.float64).reshape(
                th, tw
            )
            for zi in zidx:
                e = self.zones.envelopes[zi]
                sub = tile_grid.crop_to_box(Box(e[0], e[1], e[2], e[3]))
                if sub.empty():
                    continue
                cov = zone_coverage(sub, self.zones.parts[zi])
                m = cov > 0.0
                r0 = sub.row_offset(tile_grid)
                c0 = sub.col_offset(tile_grid)
                v = vals[r0 : r0 + sub.nrow, c0 : c0 + sub.ncol][m]
                c = cov[m]
                keep = ~np.isnan(v)
                v, c = v[keep], c[keep]
                if len(v) == 0:
                    continue
                idx = np.floor((v - self.vmin) / self.binw).astype(np.int64)
                idx = np.clip(idx, 0, self.bins - 1)
                hist = np.bincount(idx, weights=c, minlength=self.bins)
                out_zone.append(int(self.zones.zone_ids[zi]))
                out_hist.append(hist.tolist())
        return pa.table(
            {
                "zone_id": pa.array(out_zone, pa.int64()),
                "hist": pa.array(out_hist, pa.list_(pa.float64())),
            }
        )


def zonal_quantile_hist(
    raster,
    zones: pa.Table,
    quantiles: list[float],
    bins: int = 512,
    vmin: float = 0.0,
    vmax: float = 1.0,
    value_layer: str = "value",
) -> pd.DataFrame:
    """Approximate coverage-weighted quantiles from fixed-bin histograms.

    One row per zone with a ``q{pct}`` column per requested quantile:
    est = vmin + binw * (j + (target - cum_before_j) / hist_j) where j is
    the first bin whose cumulative weight reaches target = q * total.
    Error is bounded by one bin width — choose bins from the value range,
    not the data size. Values outside [vmin, vmax] clamp into edge bins."""
    zset = parse_zone_table(zones)
    zones_ref = ray.put(zset)
    partials = _prune_tiles_to_zones(raster, zset).map_batches(
        cached_stage(
            ZonalHistPartial, zones_ref, raster.grid.to_dict(), value_layer,
            bins, vmin, vmax,
        ),
        batch_format="pyarrow",
        batch_size=None,
    )
    binw = (float(vmax) - float(vmin)) / bins

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        hist = np.zeros(bins)
        for h in g["hist"]:
            hist += np.asarray(h)
        total = float(hist.sum())
        out = {"zone_id": [int(g["zone_id"].iloc[0])]}
        cum = np.cumsum(hist)
        for q in quantiles:
            target = q * total
            j = int(np.searchsorted(cum, target, side="left"))
            j = min(j, bins - 1)
            cum_before = float(cum[j - 1]) if j > 0 else 0.0
            hj = float(hist[j])
            frac = (target - cum_before) / hj if hj > 0 else 0.0
            out[f"q{int(round(100 * q)):02d}"] = [
                float(vmin) + binw * (j + frac)
            ]
        return pd.DataFrame(out)

    res = (
        partials.groupby("zone_id")
        .map_groups(finalize, batch_format="pandas")
        .to_pandas()
    )
    return res.sort_values("zone_id").reset_index(drop=True)


# ---------------- HyperLogLog registers (bounded-state distinct) ----------


HLL_P = 6  # 2^6 = 64 registers per group
HLL_M = 1 << HLL_P
_HLL_WBITS = 64 - HLL_P  # 58 low bits feed the leading-zero rank
_HLL_WMOD = 1 << _HLL_WBITS


def _bitlen_u(v: np.ndarray) -> np.ndarray:
    """Exact vectorized bit length of non-negative int64 values < 2^58
    (binary-search shifts — no float log)."""
    v = v.copy()
    bl = np.zeros(len(v), dtype=np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        big = v >= (np.int64(1) << s)
        bl[big] += s
        v[big] >>= s
    return bl + (v > 0)


def hll_rho(h: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """64-bit hashes -> (bucket, rho): bucket = top p bits, rho = 1 + count
    of leading zeros in the low 58-bit word (w == 0 -> 59). Flajolet et al.
    2007 (public algorithm); pure integer ops, identical in SQL."""
    hu = h.astype(np.uint64)
    bucket = (hu >> np.uint64(_HLL_WBITS)).astype(np.int64)
    w = (hu % np.uint64(_HLL_WMOD)).astype(np.int64)
    rho = _HLL_WBITS + 1 - _bitlen_u(w)
    return bucket, rho


def hll_registers(ds, group_col: str = "source", value_col: str = "url",
                  coarse: int = 64):
    """Per-group HyperLogLog registers over the md5-u64 hash of value_col:
    one (group, bucket, register=max rho) row per OCCUPIED bucket — pure
    integers, bit-exact in SQL (the estimator below is float and lives in
    tests). Ray shape: per-batch partial max (rows bounded by groups x 64
    per block), then ONE coarse groupby with a vectorized max finalize —
    the same additive-merge contract as the KMV and histogram sketches.
    """
    import hashlib

    def partial(batch: pa.Table) -> pa.Table:
        grp = batch.column(group_col).to_pylist()
        vals = batch.column(value_col).to_pylist()
        h = np.fromiter(
            (int(hashlib.md5(str(v).encode()).hexdigest()[:16], 16) for v in vals),
            dtype=np.uint64,
            count=len(vals),
        )
        bucket, rho = hll_rho(h)
        df = pd.DataFrame({"g": grp, "bucket": bucket, "rho": rho})
        agg = df.groupby(["g", "bucket"], as_index=False)["rho"].max()
        key = pd.util.hash_pandas_object(agg["g"], index=False).to_numpy()
        return pa.table(
            {
                group_col: pa.array(agg["g"], pa.string()),
                "bucket": pa.array(agg["bucket"].to_numpy(), pa.int64()),
                "rho": pa.array(agg["rho"].to_numpy(), pa.int64()),
                "ckey": pa.array(
                    (key % np.uint64(coarse)).astype(np.int64), pa.int64()
                ),
            }
        )

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        agg = (
            g.groupby([group_col, "bucket"], as_index=False)["rho"]
            .max()
            .rename(columns={"rho": "register"})
        )
        agg["bucket"] = agg["bucket"].astype(np.int64)
        agg["register"] = agg["register"].astype(np.int64)
        return agg

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("ckey")
        .map_groups(finalize, batch_format="pandas")
    )


def hll_estimate(registers: np.ndarray, m: int = HLL_M) -> float:
    """Standard HLL estimate from a group's DENSE register vector (missing
    buckets = 0), with the small-range correction. Test-side companion of
    hll_registers (floats, so not part of the bit-exact oracle surface)."""
    alpha = 0.7213 / (1.0 + 1.079 / m)
    raw = alpha * m * m / np.sum(np.power(2.0, -registers.astype(np.float64)))
    zeros = int(np.sum(registers == 0))
    if raw <= 2.5 * m and zeros > 0:
        return m * np.log(m / zeros)
    return float(raw)
