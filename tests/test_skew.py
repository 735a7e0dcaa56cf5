"""Skew-handling checks: many zones on one tile, a continental zone spanning
every tile, and zone counts far above tile counts — correctness and
determinism under the decomposition described in SURVEY.md §4.3."""

import numpy as np
import pandas as pd
import pytest

from exactextractr_ray import synth, wkbio
from exactextractr_ray.coverage import coverage_fraction_wkb
from exactextractr_ray.stats import RasterStats
from exactextractr_ray.sources.zones import zone_table


@pytest.fixture(scope="module")
def _ray(ray_session):
    return None


def test_many_zones_per_tile(_ray):
    """300 small zones all landing on a 2-tile raster."""
    from exactextractr_ray.pipelines.zonal import exact_extract
    from exactextractr_ray.sources.raster import synthetic_raster_dataset

    n = 32
    rng = np.random.default_rng(42)
    rows = []
    for k in range(300):
        x0 = rng.uniform(0, n - 2)
        y0 = rng.uniform(0, n - 2)
        rows.append((k, f"z{k}", wkbio.rect_wkb(x0, y0, x0 + 1.5, y0 + 1.5)))
    zones = zone_table(rows)
    rd = synthetic_raster_dataset(n=n, tile=16)
    res = exact_extract(rd, zones, ["count", "sum"]).to_pandas()
    assert len(res) == 300
    # spot-check 10 zones against the kernel
    g = synth.synth_grid(n)
    rr, cc = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    vals = synth.synth_values(rr, cc)
    for k in range(0, 300, 31):
        cov = coverage_fraction_wkb(g, rows[k][2])
        st = RasterStats()
        st.process(vals, cov)
        got = res[res.zone_id == k].iloc[0]
        assert got["count"] == pytest.approx(st.count(), rel=1e-12)
        assert got["sum"] == pytest.approx(st.sum(), rel=1e-12)


def test_continental_zone_decomposition(_ray):
    """One zone covering 95% of a 256x256 grid: becomes many (zone, tile)
    partials, merges deterministically, matches the kernel."""
    from exactextractr_ray.pipelines.zonal import exact_extract
    from exactextractr_ray.sources.raster import synthetic_raster_dataset

    n = 256
    zones = zone_table([(0, "continent", wkbio.rect_wkb(1.25, 1.25, n - 1.25, n - 1.25))])
    rd = synthetic_raster_dataset(n=n, tile=32)
    res = exact_extract(rd, zones, ["count", "sum", "mean", "stdev"]).to_pandas()
    g = synth.synth_grid(n)
    rr, cc = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    vals = synth.synth_values(rr, cc)
    cov = coverage_fraction_wkb(g, wkbio.rect_wkb(1.25, 1.25, n - 1.25, n - 1.25))
    st = RasterStats()
    st.process(vals, cov)
    assert res["count"].iloc[0] == pytest.approx(st.count(), rel=1e-12)
    assert res["sum"].iloc[0] == pytest.approx(st.sum(), rel=1e-12)
    assert res["mean"].iloc[0] == pytest.approx(st.mean(), rel=1e-12)
    assert res["stdev"].iloc[0] == pytest.approx(st.stdev(), rel=1e-9)


def test_hot_key_pip_join(_ray):
    """Every point in one zone (max key skew in the join output)."""
    import ray.data
    from exactextractr_ray.stages.pip_join import pip_join

    pts = pd.DataFrame(
        {
            "pid": np.arange(20000),
            "lon": np.random.default_rng(1).uniform(1, 2, 20000),
            "lat": np.random.default_rng(2).uniform(1, 2, 20000),
        }
    )
    zones = zone_table([(7, "hot", wkbio.rect_wkb(0, 0, 3, 3))])
    joined = pip_join(ray.data.from_pandas(pts).repartition(8), zones)
    assert joined.count() == 20000


def test_recursive_decomposition_bit_identical(_ray):
    """Forcing boundary work items to split recursively (tiny
    max_cells_per_item) yields bit-identical stats to the unsplit run."""
    from exactextractr_ray.pipelines.zonal import exact_extract
    from exactextractr_ray.sources.raster import synthetic_raster_dataset
    from exactextractr_ray.sources.zones import synth_rect_zones

    zones = synth_rect_zones(4, 64)
    base = (
        exact_extract(
            synthetic_raster_dataset(n=64, tile=64),
            zones,
            ["count", "sum", "mean", "median", "variety"],
        )
        .to_pandas()
        .sort_values("zone_id")
        .reset_index(drop=True)
    )
    split = (
        exact_extract(
            synthetic_raster_dataset(n=64, tile=64),
            zones,
            ["count", "sum", "mean", "median", "variety"],
            max_cells_per_item=64,
        )
        .to_pandas()
        .sort_values("zone_id")
        .reset_index(drop=True)
    )
    for c in ["count", "sum", "mean", "median", "variety"]:
        assert np.array_equal(base[c].to_numpy(), split[c].to_numpy()), c


def test_minhash_bucket_cap_counts_drops(_ray, caplog):
    """A degenerate LSH bucket (identical boilerplate docs over the cap) is
    truncated AND the drop count is surfaced via a logged warning — silent
    truncation was an ADVICE finding."""
    import logging

    import ray.data
    from exactextractr_ray.stages import dedup

    n = dedup._MAX_BUCKET + 40
    df = pd.DataFrame(
        {"doc_id": np.arange(n, dtype=np.int64),
         "text": ["same boilerplate text repeated endlessly here"] * n}
    )
    with caplog.at_level(logging.WARNING, logger="exactextractr_ray.stages.dedup"):
        out = dedup.minhash_lsh_pairs(
            ray.data.from_pandas(df), threshold=0.5
        ).to_pandas()
    assert any("dropped" in r.message for r in caplog.records)
    # surviving pairs are all true duplicates with jaccard exactly 1.0
    assert len(out) > 0
    assert (out["jaccard"] == 1.0).all()
    # sentinels never leak into the output
    assert (out["doc_a"] >= 0).all()
