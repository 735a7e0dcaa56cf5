"""``ray job submit`` entrypoint (BASELINE.json: "the full pipeline runs via
ray job submit on fixed clusters").

On a real cluster:

    ray job submit --address http://<head>:8265 \
        --working-dir /root/repo -- python tools/ray_job.py \
        --sf-dir /data/sf1 --out /data/out

In this sandbox there is no cluster; the script also runs standalone
(``python tools/ray_job.py``) against a local session. It owns its Ray
session (library code never does), runs the flagship pipeline, and writes
resumable partitioned output + the per-zone summary.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default="/tmp/ray_job_out")
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args(argv)

    import ray

    owns = not ray.is_initialized()
    if owns:
        kwargs = {"include_dashboard": False}
        if args.num_cpus:
            kwargs.update(address="local", num_cpus=args.num_cpus)
        ray.init(**kwargs)

    sys.path.insert(0, "/root/repo")
    from exactextractr_ray.pipelines.flagship import flagship
    from exactextractr_ray.pipelines.resumable_extract import resumable_extract_cells
    from exactextractr_ray.sources.raster import synthetic_raster_dataset
    from exactextractr_ray.sources.zones import synth_rect_zones

    t0 = time.time()
    summary = flagship(args.sf_dir)
    summary.to_parquet(f"{args.out}_zones.parquet")

    # demonstration of the resumable large-output path
    res = resumable_extract_cells(
        synthetic_raster_dataset(n=256, tile=64),
        synth_rect_zones(16, 256),
        f"{args.out}_cells",
        bands=8,
        include_cell=True,
    )
    print(
        json.dumps(
            {
                "zones": len(summary),
                "text_mismatches": int(summary["text_extraction_mismatches"].iloc[0]),
                "cells_partitions_written": len(res["written"]),
                "cells_partitions_skipped": len(res["skipped"]),
                "seconds": round(time.time() - t0, 2),
            }
        )
    )
    if owns:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
