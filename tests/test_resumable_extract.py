"""End-to-end resumable extraction: full output = non-resumable run; crash
mid-run resumes without recomputing finished bands."""

import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def _ray(ray_session):
    return None


def test_resumable_extract_cells(_ray, tmp_path):
    from exactextractr_ray.pipelines.resumable_extract import resumable_extract_cells
    from exactextractr_ray.pipelines.zonal import extract_cells
    from exactextractr_ray.sources.raster import synthetic_raster_dataset
    from exactextractr_ray.sources.zones import synth_rect_zones
    from exactextractr_ray.state.lineage import read_resumable

    rd = synthetic_raster_dataset(n=32, tile=8)
    zones = synth_rect_zones(4, 32)
    out = str(tmp_path / "cells")

    res = resumable_extract_cells(rd, zones, out, bands=4, include_cell=True)
    assert len(res["written"]) == 4 and not res["skipped"]

    # full equality with the direct streaming pipeline
    direct = (
        extract_cells(synthetic_raster_dataset(n=32, tile=8), zones, include_cell=True)
        .to_pandas()
        .sort_values(["zone_id", "cell"])
        .reset_index(drop=True)
    )
    resumed = (
        read_resumable(out)
        .to_pandas()
        .sort_values(["zone_id", "cell"])
        .reset_index(drop=True)
    )
    assert len(direct) == len(resumed)
    assert np.array_equal(
        direct["value"].to_numpy(), resumed["value"].to_numpy(), equal_nan=True
    )
    assert np.array_equal(direct["cov"].to_numpy(), resumed["cov"].to_numpy())

    # crash simulation: drop one band's manifest -> only that band recomputes
    os.remove(os.path.join(out, "_manifest", "band002.json"))
    res2 = resumable_extract_cells(rd, zones, out, bands=4, include_cell=True)
    assert res2["written"] == ["band002"]
    assert len(res2["skipped"]) == 3

    # changing the zones changes fingerprints -> full recompute
    res3 = resumable_extract_cells(rd, synth_rect_zones(5, 32), out, bands=4,
                                   include_cell=True)
    assert len(res3["written"]) == 4
