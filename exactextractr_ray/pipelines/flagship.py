"""Flagship end-to-end pipeline (SURVEY.md §7.0):

pages -> frozen text extraction -> quality/token signals -> deterministic
geocode -> spatial cell assignment -> point-in-polygon join against zones ->
page-density raster -> exact zonal statistics of density per zone.

Every wide stage is a vectorized Arrow ``map_batches``; the only shuffles are
the per-cell density count and the final per-zone merges, both over tiny
aggregate rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data

from ..grid import Grid
from ..sources.pages import read_pages
from ..sources.raster import raster_from_array
from ..sources.zones import synth_geo_zones
from ..stages.geocode import assign_cell_batch, geocode_doc_batch
from ..stages.pip_join import pip_join
from ..stages.text import extract_text_batch, quality_batch
from .zonal import exact_extract

CELL_RES_DEG = 3.0
DENSITY_GRID = Grid(-180.0, -90.0, 180.0, 90.0, CELL_RES_DEG, CELL_RES_DEG)


def flagship(sf_dir: str, num_zones: int = 24) -> pd.DataFrame:
    """Returns the per-zone summary table (one row per geo zone)."""
    pages = read_pages(sf_dir)
    pages = pages.map_batches(extract_text_batch, batch_format="pyarrow")
    # byte-identical invariant: extracted_text must equal the source text;
    # violations surface as a count so the pipeline fails loudly in tests
    pages = pages.map_batches(quality_batch, batch_format="pyarrow")
    geo = pages.map_batches(geocode_doc_batch, batch_format="pyarrow").map_batches(
        lambda b: assign_cell_batch(b, CELL_RES_DEG), batch_format="pyarrow"
    )

    # Fold the byte-identity invariant into a 1-byte-per-row flag while the
    # text columns are still in flight, then materialize ONLY the narrow
    # (doc_id, lon, lat, cell, __bad) projection for the two consumers below.
    # The corpus text itself never enters the object-store checkpoint.
    def narrow(b):
        import pyarrow as pa
        import pyarrow.compute as pc

        bad = pc.cast(
            pc.fill_null(
                pc.not_equal(b.column("extracted_text"), b.column("text")),
                True,
            ),
            pa.int8(),
        )
        return b.select(["doc_id", "lon", "lat", "cell"]).append_column(
            "__bad", bad
        )

    geo = geo.map_batches(narrow, batch_format="pyarrow").materialize()

    # branch 1: per-cell page density -> small counts table -> density raster
    counts = geo.groupby("cell").count().to_pandas()
    dens = np.zeros((DENSITY_GRID.nrow, DENSITY_GRID.ncol))
    ncols = DENSITY_GRID.ncol
    for cell, n in zip(counts["cell"], counts["count()"]):
        cy, cx = int(cell) // ncols, int(cell) % ncols
        # cell ids count rows from the south; grid rows count from the north
        dens[DENSITY_GRID.nrow - 1 - cy, cx] = float(n)
    raster = raster_from_array(dens, DENSITY_GRID, tile=30)

    zones = synth_geo_zones(num_zones)
    zonal = exact_extract(
        raster, zones, ["count", "sum", "mean", "max"], include_cols=["name"]
    ).to_pandas()
    zonal = zonal.rename(
        columns={
            "count": "covered_cells",
            "sum": "pages_in_zone_density",
            "mean": "mean_density",
            "max": "max_density",
        }
    )

    # branch 2: exact page counts per zone via the PIP join
    joined = pip_join(geo, zones)
    per_zone = joined.groupby("zone_id").count().to_pandas()
    per_zone = per_zone.rename(columns={"count()": "n_pages"})

    out = zonal.merge(per_zone, on="zone_id", how="left")
    out["n_pages"] = out["n_pages"].fillna(0).astype(np.int64)
    out["text_extraction_mismatches"] = int(geo.sum("__bad"))
    return out
