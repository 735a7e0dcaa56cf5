"""Stat-descriptor plan language, mirroring the reference CLI's parser
(/root/reference/src/exactextract/src/utils.cpp:36-128):

* raster descriptor: ``name:file`` or ``name:file[band]`` (band = layer name
  or index in the tile table here);
* stat descriptor: ``stat(values)``, ``stat(values,weights)`` or
  ``out_name=stat(values,weights)``; a bare ``stat`` applies to the default
  value raster.

Parsed into plain dataclasses consumed by the pipelines and the CLI.
"""

from __future__ import annotations

import re
from dataclasses import dataclass


@dataclass(frozen=True)
class RasterDescriptor:
    name: str
    path: str
    band: str | None = None


@dataclass(frozen=True)
class StatDescriptor:
    name: str  # output column name
    stat: str
    values: str | None  # raster name (None = default)
    weights: str | None


_RASTER_RE = re.compile(r"^(?:(?P<name>\w+):)?(?P<path>[^\[\]]+?)(?:\[(?P<band>[^\]]+)\])?$")
_STAT_RE = re.compile(
    r"^(?:(?P<out>\w+)=)?(?P<stat>\w+)(?:\((?P<args>[^)]*)\))?$"
)


def parse_raster_descriptor(desc: str) -> RasterDescriptor:
    m = _RASTER_RE.match(desc.strip())
    if not m:
        raise ValueError(f"invalid raster descriptor: {desc!r}")
    name = m.group("name") or "values"
    return RasterDescriptor(name=name, path=m.group("path"), band=m.group("band"))


def parse_stat_descriptor(desc: str) -> StatDescriptor:
    m = _STAT_RE.match(desc.strip())
    if not m:
        raise ValueError(f"invalid stat descriptor: {desc!r}")
    stat = m.group("stat")
    args = [a.strip() for a in (m.group("args") or "").split(",") if a.strip()]
    values = args[0] if args else None
    weights = args[1] if len(args) > 1 else None
    if len(args) > 2:
        raise ValueError(f"too many arguments in stat descriptor: {desc!r}")
    out = m.group("out") or stat
    return StatDescriptor(name=out, stat=stat, values=values, weights=weights)
