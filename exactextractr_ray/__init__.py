"""exactextractr_ray — a from-scratch Ray-Data-native zonal-statistics and
spatial-join engine with the query capabilities of isciences/exactextractr.

Reference: /root/reference (exactextractr 0.10.1). This package re-expresses
the reference's semantics on idiomatic Ray Data primitives: Dataset pipelines
of vectorized Arrow ``map_batches``, actor pools for stateful stages, and
``groupby`` shuffles for the zone-merge — see SURVEY.md for the blueprint.
"""

from .grid import Box, Grid
from .stats import RasterStats, VarState
from .coverage import coverage_matrix, coverage_fraction_wkb, length_matrix
from . import wkbio

__all__ = [
    "Box",
    "Grid",
    "RasterStats",
    "VarState",
    "coverage_matrix",
    "coverage_fraction_wkb",
    "length_matrix",
    "wkbio",
]

__version__ = "0.1.0"
