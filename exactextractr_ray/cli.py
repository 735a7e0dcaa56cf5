"""Command-line entry point — the Ray-native analog of the reference's
``exactextract`` CLI (/root/reference/src/exactextract/src/exactextract.cpp:42-172):

    python -m exactextractr_ray.cli \
        -p zones.parquet -r values:tiles_dir -s "mean" -s "wsum=weighted_sum(values,weight)" \
        -f zone_id -o out.parquet

* ``-p``: zones parquet (zone_id, geom_wkb columns; -f picks the id column)
* ``-r``: raster descriptor name:tiles_dir[layer] — a tile-table directory
  written by sources.raster.write_raster_parquet
* ``-s``: stat descriptor out=stat(values,weights) (repeatable)
* ``-o``: output parquet (or .csv)
* ``--strategy``: ``raster-sequential`` (default; broadcast-zones,
  tile-parallel — the scalable shape) or ``feature-sequential`` (zones are
  the parallel unit, raster windows read on demand with predicate pushdown
  — the reference's FeatureSequentialProcessor shape, cheaper when zones
  ≪ tiles). Both plans produce bit-identical results.

Owns its own Ray session (scripts init; library code never does).
"""

from __future__ import annotations

import argparse
import sys


def _open_raster_path(path: str, band: int = 1, var: str | None = None,
                      layer: str = "value", tile: int = 256):
    """Format dispatch shared by the zonal and terrain subcommands:
    GeoTIFF / NetCDF classic / Arc-ASCII / ENVI (.hdr sidecar) / native
    parquet tile directory."""
    if path.endswith((".tif", ".tiff")):
        from .sources.geotiff import geotiff_raster_dataset

        return geotiff_raster_dataset(path, band=band, tile=tile)
    if path.endswith(".nc"):
        from .sources.netcdf_raster import netcdf_raster_dataset

        return netcdf_raster_dataset(path, var=var)
    if path.endswith(".asc"):
        from .sources.ascii_grid import ascii_grid_raster_dataset

        return ascii_grid_raster_dataset(path)
    import os as _os

    if _os.path.isfile(path) and (
        _os.path.exists(path + ".hdr")
        or _os.path.exists(_os.path.splitext(path)[0] + ".hdr")
    ):
        from .sources.envi import envi_raster_dataset

        return envi_raster_dataset(path, band=band)
    from .sources.raster import read_raster_parquet

    return read_raster_parquet(path)


# op -> (pipeline key, output column)
_TERRAIN_OPS = {
    "slope": ("terrain", "slope_num"),
    "aspect": ("terrain", "aspect8"),
    "hillshade": ("terrain", "hillshade"),
    "shade": ("terrain", "shade"),
    "tpi": ("indices", "tpi"),
    "tri": ("indices", "tri"),
    "roughness": ("indices", "roughness"),
    "flowdir": ("flowdir", "flowdir"),
    "flowacc": ("flowacc", "n_upstream"),
    "erode": ("morph", "focal_min"),
    "dilate": ("morph", "focal_max"),
    "morphgrad": ("morph", "morph_gradient"),
    "fillnodata": ("fill", "fill_val"),
    "sieve": ("sieve", "val"),
    "costdist": ("costdist", "dist"),
}

_MAX_TIF_CELLS = 1 << 26  # driver-assembled single-file output guard


def terrain_main(argv) -> int:
    """gdaldem-style terrain subcommand:

        python -m exactextractr_ray.cli terrain -r dem.tif \
            --op hillshade -o out.tif

    Ops: slope (degrees), aspect (8-sector descent code), hillshade
    (az=315/alt=45 byte), shade (raw cosine), tpi, tri, roughness,
    flowdir (ESRI D8 codes), flowacc (upstream cell counts), erode /
    dilate / morphgrad (3x3 grey morphology), fillnodata (8-ray IDW,
    --max-dist), sieve (gdal_sieve small-region removal, --threshold),
    costdist (chamfer-(2,3) cost distance from --source cells). Inputs as in
    the zonal CLI (.tif/.nc/.asc/ENVI/parquet tiles). `-o out.parquet`
    streams the (cell, value) table (the scale path — partitioned,
    resumable); `-o out.tif` assembles a single raster on the driver
    (guarded to {M} cells) for desktop-sized outputs.
    """.format(M=_MAX_TIF_CELLS)
    import numpy as np

    ap = argparse.ArgumentParser(prog="exactextractr-ray terrain")
    ap.add_argument("-r", "--raster", required=True)
    ap.add_argument("--op", required=True, choices=sorted(_TERRAIN_OPS))
    ap.add_argument("-o", "--output", required=True,
                    help="output .parquet dir (streaming) or .tif")
    ap.add_argument("--band", type=int, default=1)
    ap.add_argument("--var", default=None, help="NetCDF variable")
    ap.add_argument("--tile", type=int, default=256)
    ap.add_argument("--num-cpus", type=int, default=None)
    ap.add_argument("--threshold", type=int, default=4,
                    help="sieve: minimum region size kept")
    ap.add_argument("--max-dist", type=int, default=8,
                    help="fillnodata: donor search radius (steps)")
    ap.add_argument("--source", default=None,
                    help="costdist: semicolon-separated row,col seeds")
    args = ap.parse_args(argv)

    import ray

    owns_ray = not ray.is_initialized()
    if owns_ray:
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            log_to_driver=False,
        )

    rd = _open_raster_path(args.raster, band=args.band, var=args.var,
                           tile=args.tile)
    kind, col = _TERRAIN_OPS[args.op]
    if kind == "terrain":
        from .pipelines.focal import terrain_3x3

        out = terrain_3x3(rd)
    elif kind == "indices":
        from .pipelines.focal import terrain_indices_3x3

        out = terrain_indices_3x3(rd)
    elif kind == "flowdir":
        from .pipelines.focal import flow_direction_d8

        out = flow_direction_d8(rd)
    elif kind == "morph":
        from .pipelines.focal import focal_minmax_3x3

        out = focal_minmax_3x3(rd)
    elif kind == "fill":
        from .pipelines.interpolate import fillnodata

        out = fillnodata(rd, max_dist=args.max_dist).select_columns(
            ["cell", "fill_val"]
        )
    elif kind == "sieve":
        import pyarrow as pa

        from .pipelines.sieve import sieve_raster

        runs = sieve_raster(rd, threshold=args.threshold)
        ncol_g = rd.grid.ncol
        cells_out, vals_out = [], []
        for r in runs.itertuples():
            cs = np.arange(int(r.col_start), int(r.col_end) + 1,
                           dtype=np.int64)
            cells_out.append(int(r.row) * ncol_g + cs)
            vals_out.append(np.full(len(cs), float(r.val)))
        import ray.data as _rd

        out = _rd.from_arrow(pa.table({
            "cell": pa.array(
                np.concatenate(cells_out) if cells_out else
                np.array([], np.int64), pa.int64()),
            "val": pa.array(
                np.concatenate(vals_out) if vals_out else
                np.array([], np.float64), pa.float64()),
        }))
    elif kind == "costdist":
        import pyarrow as pa

        from .pipelines.costdistance import cost_distance

        if not args.source:
            raise SystemExit("costdist requires --source \"r,c[;r,c...]\"")
        seeds = [tuple(int(v) for v in pair.split(","))
                 for pair in args.source.split(";")]
        cd = cost_distance(rd, seeds)
        ncol_g = rd.grid.ncol
        import ray.data as _rd

        out = _rd.from_arrow(pa.table({
            "cell": pa.array(
                cd["row"].to_numpy() * ncol_g + cd["col"].to_numpy(),
                pa.int64()),
            "dist": pa.array(cd["dist"].to_numpy().astype(np.float64),
                             pa.float64()),
        }))
    else:
        from .pipelines.hydrology import flow_accumulation_d8

        out = flow_accumulation_d8(rd)
    out = out.select_columns(["cell", col])

    if args.op == "slope":
        import pyarrow as pa

        dx = float(rd.grid.dx)

        def to_degrees(b: pa.Table) -> pa.Table:
            v = b.column(col).to_numpy().astype(np.float64)
            deg = np.degrees(np.arctan(np.sqrt(v) / (8.0 * dx)))
            return pa.table({"cell": b.column("cell"), col: pa.array(deg)})

        out = out.map_batches(to_degrees, batch_format="pyarrow")

    if args.output.endswith(".parquet") or not args.output.endswith(".tif"):
        out.write_parquet(args.output)
        if owns_ray:
            ray.shutdown()
        return 0

    g = rd.grid
    n_cells = g.nrow * g.ncol
    if n_cells > _MAX_TIF_CELLS:
        raise SystemExit(
            f"single-file .tif output assembles on the driver; {n_cells} "
            f"cells exceeds the {_MAX_TIF_CELLS} guard — use a .parquet "
            "output directory instead"
        )
    arr = np.full(n_cells, np.nan)
    if args.op == "fillnodata":
        # fillnodata's table holds only the FILLED holes; the .tif
        # output is the original raster with those holes patched
        for b in rd.ds.iter_batches(batch_format="pyarrow"):
            for i in range(b.num_rows):
                row0 = int(b.column("row0")[i].as_py())
                col0 = int(b.column("col0")[i].as_py())
                th = int(b.column("th")[i].as_py())
                tw = int(b.column("tw")[i].as_py())
                v = np.asarray(
                    b.column("values").combine_chunks()[i].values,
                    np.float64,
                ).reshape(th, tw)
                idx = ((np.arange(row0, row0 + th)[:, None] * g.ncol)
                       + np.arange(col0, col0 + tw)[None, :])
                arr[idx.ravel()] = v.ravel()
    for b in out.iter_batches(batch_format="pyarrow"):
        arr[b.column("cell").to_numpy()] = b.column(col).to_numpy()
    from .sources.geotiff import write_geotiff

    write_geotiff(arr.reshape(g.nrow, g.ncol), g, args.output, nodata=-9999.0)
    if owns_ray:
        ray.shutdown()
    return 0


def main(argv=None) -> int:
    if argv is None:
        argv = sys.argv[1:]
    if argv and argv[0] == "terrain":
        return terrain_main(argv[1:])
    ap = argparse.ArgumentParser(prog="exactextractr-ray")
    ap.add_argument("-p", "--polygons", required=True, help="zones parquet file")
    ap.add_argument(
        "-r", "--raster", action="append", required=True,
        help="raster descriptor name:tiles_dir[layer]",
    )
    ap.add_argument(
        "-s", "--stat", action="append", required=True,
        help="stat descriptor out=stat(values,weights)",
    )
    ap.add_argument("-f", "--fid", default="zone_id", help="zone id column")
    ap.add_argument("-o", "--output", required=True, help="output .parquet or .csv")
    ap.add_argument(
        "--strategy", default="raster-sequential",
        choices=["raster-sequential", "feature-sequential"],
    )
    ap.add_argument(
        "--max-cells", type=int, default=None,
        help="max raster cells held in memory per work item (the reference's "
        "max_cells_in_memory; maps to MAX_CELLS_PER_ITEM — oversized "
        "zone/tile crops recursively split until bounded). Applies to the "
        "raster-sequential strategy; results are bit-identical at any value.",
    )
    ap.add_argument("--num-cpus", type=int, default=None)
    # reference parity (exactextract.cpp:57-59): rename/retype the id column
    ap.add_argument("--id-name", default=None,
                    help="override name of id field in output")
    ap.add_argument("--id-type", default=None,
                    choices=["int32", "int64", "float64", "string"],
                    help="override type of id field in output")
    ap.add_argument("--progress", action="store_true",
                    help="show Ray Data progress bars")
    args = ap.parse_args(argv)

    # the reference requires both or neither (exactextract.cpp:68-71)
    if (args.id_name is None) != (args.id_type is None):
        print("Must specify both --id-type and --id-name", file=sys.stderr)
        return 1

    import ray

    owns_ray = not ray.is_initialized()
    if owns_ray:
        kwargs = {"address": "local", "include_dashboard": False}
        if args.num_cpus:
            kwargs["num_cpus"] = args.num_cpus
        ray.init(**kwargs)

    import ray.data as _rd

    _rd.DataContext.get_current().enable_progress_bars = bool(args.progress)

    import pyarrow.parquet as pq

    from .plan import parse_raster_descriptor, parse_stat_descriptor
    from .pipelines.mixed import exact_extract_mixed
    from .pipelines.zonal import exact_extract
    from .sources.raster import read_raster_parquet

    def open_raster(d):
        """Format dispatch, mirroring GDAL's any-band ingestion
        (gdal_raster_wrapper.cpp:22-95): GeoTIFF (band index in [..]),
        NetCDF classic (variable name in [..]), Arc/Info ASCII grid, or
        the engine's native parquet tile directory (layer name in [..]).
        Returns (dataset, value_layer, tiles_path_or_None)."""
        p = d.path
        if p.endswith((".tif", ".tiff")):
            from .sources.geotiff import geotiff_raster_dataset

            band = int(d.band) if (d.band or "").isdigit() else 1
            return geotiff_raster_dataset(p, band=band), "value", None
        if p.endswith(".nc"):
            from .sources.netcdf_raster import netcdf_raster_dataset

            return netcdf_raster_dataset(p, var=d.band), "value", None
        if p.endswith(".asc"):
            from .sources.ascii_grid import ascii_grid_raster_dataset

            return ascii_grid_raster_dataset(p), "value", None
        import os as _os

        if _os.path.isfile(p) and (
            _os.path.exists(p + ".hdr")
            or _os.path.exists(_os.path.splitext(p)[0] + ".hdr")
        ):  # ENVI binary identified by its .hdr sidecar
            from .sources.envi import envi_raster_dataset

            band = int(d.band) if (d.band or "").isdigit() else 1
            return envi_raster_dataset(p, band=band), "value", None
        return read_raster_parquet(p), (d.band or "value"), p

    rasters = {}
    for rd in args.raster:
        d = parse_raster_descriptor(rd)
        ds, vlayer, tiles_path = open_raster(d)
        rasters[d.name] = (d, ds, vlayer, tiles_path)
    stats = [parse_stat_descriptor(s) for s in args.stat]

    if args.polygons.endswith(".shp"):
        from .sources.zones import read_shp_zones

        zones = read_shp_zones(args.polygons, id_col=None)
    elif args.polygons.endswith(".gpkg"):
        from .sources.gpkg import read_gpkg_zones

        zones = read_gpkg_zones(args.polygons)
    else:
        zones = pq.read_table(args.polygons)
    if args.fid != "zone_id":
        idx = zones.column_names.index(args.fid)
        zones = zones.set_column(idx, "zone_id", zones.column(args.fid))

    # run one extraction per stat descriptor, concatenating columns.
    # weights may name (a) a layer of the SAME raster (co-located tiles) or
    # (b) another raster descriptor — routed through the mixed-grid path,
    # which broadcasts the weight raster and tolerates compatible-resolution
    # differences (the reference's RasterView behavior).
    default_name = next(iter(rasters))
    result = None
    for sd in stats:
        rname = sd.values or default_name
        d, raster, value_layer, tiles_path = rasters[rname]
        if sd.weights is not None and sd.weights in rasters and sd.weights != rname:
            wd, wraster, wlayer, _wp = rasters[sd.weights]
            t = exact_extract_mixed(
                raster,
                wraster,
                zones,
                [sd.stat],
                value_layer=value_layer,
                weight_layer=wlayer,
            ).to_pandas()
        else:
            weight_layer = None
            if sd.weights is not None:
                weight_layer = sd.weights  # a layer of the value raster
            if args.strategy == "feature-sequential":
                from .pipelines.zonal_feature_seq import (
                    exact_extract_feature_seq,
                )

                if tiles_path is None:
                    # file-format raster: convert once to the native tile
                    # layout (the per-zone window-read plan needs tile
                    # pushdown); cached per CLI run
                    import tempfile

                    from .sources.raster import write_raster_parquet

                    tiles_path = tempfile.mkdtemp(
                        prefix="exactextract_tiles_", dir="/tmp"
                    )
                    write_raster_parquet(raster, tiles_path)
                    rasters[rname] = (d, raster, value_layer, tiles_path)

                t = exact_extract_feature_seq(
                    tiles_path,
                    zones,
                    [sd.stat],
                    value_layer=value_layer,
                    weight_layer=weight_layer,
                ).to_pandas()
            else:
                t = exact_extract(
                    raster,
                    zones,
                    [sd.stat],
                    value_layer=value_layer,
                    weight_layer=weight_layer,
                    max_cells_per_item=args.max_cells,
                ).to_pandas()
        stat_col = [c for c in t.columns if c != "zone_id"][0]
        t = t.rename(columns={stat_col: sd.name})
        result = t if result is None else result.merge(t, on="zone_id")

    # .shp/.gpkg output: align one zone geometry per result row (before any
    # id rename) — these sinks carry geometry + the attribute table
    geoms = None
    if args.output.endswith((".shp", ".gpkg")):
        gmap = dict(
            zip(
                zones.column("zone_id").to_pylist(),
                zones.column("geom_wkb").to_pylist(),
            )
        )
        geoms = [gmap.get(z) for z in result["zone_id"]]

    if args.id_name is not None:
        import numpy as _np

        caster = {
            "int32": _np.int32, "int64": _np.int64,
            "float64": _np.float64, "string": str,
        }[args.id_type]
        result = result.rename(columns={"zone_id": args.id_name})
        result[args.id_name] = result[args.id_name].map(caster)

    from .sources.sinks import write_result

    # .parquet / .csv / .dbf (attribute table only) / .shp (+.shx+.dbf full
    # shapefile) / .nc (NetCDF-3) / .db/.sqlite / .gpkg (GeoPackage) — the
    # GDALWriter sink set without GDAL (SQLite stands in for PostgreSQL,
    # gdal_writer.cpp:26-143: no DB server in this environment)
    write_result(result, args.output, geoms)
    print(f"wrote {len(result)} rows to {args.output}", file=sys.stderr)
    if owns_ray:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
