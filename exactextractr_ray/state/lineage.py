"""Per-partition lineage manifest + resumable partitioned output.

The reference has no resume story (a crash restarts the whole run); the
north rule requires checkpoint/resume with per-partition lineage records.

Layout under ``out_dir``:

    part=<key>/*.parquet          one directory per logical partition
    _manifest/<key>.json          lineage record, written AFTER the data

A partition's manifest record is written atomically (tmp + rename) only
after its parquet files are fully written, so a crash mid-partition leaves
no manifest record and the partition is redone on resume. Records carry the
input fingerprint: if the input changed, the partition is recomputed even
though output exists.

Record fields: stage, partition_key, input_fingerprint, output_path,
metrics (rows, bytes, seconds), finished_at.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass


@dataclass
class PartitionRecord:
    stage: str
    partition_key: str
    input_fingerprint: str
    output_path: str
    metrics: dict

    def to_json(self) -> dict:
        return {
            "stage": self.stage,
            "partition_key": self.partition_key,
            "input_fingerprint": self.input_fingerprint,
            "output_path": self.output_path,
            "metrics": self.metrics,
        }


class LineageManifest:
    def __init__(self, out_dir: str, stage: str):
        self.out_dir = out_dir
        self.stage = stage
        self.manifest_dir = os.path.join(out_dir, "_manifest")
        os.makedirs(self.manifest_dir, exist_ok=True)

    def record_path(self, key: str) -> str:
        return os.path.join(self.manifest_dir, f"{key}.json")

    def done(self, key: str, input_fingerprint: str) -> bool:
        """True iff the partition finished with the SAME input fingerprint."""
        p = self.record_path(key)
        if not os.path.exists(p):
            return False
        try:
            with open(p) as f:
                rec = json.load(f)
        except (json.JSONDecodeError, OSError):
            return False
        return (
            rec.get("stage") == self.stage
            and rec.get("input_fingerprint") == input_fingerprint
        )

    def commit(self, rec: PartitionRecord) -> None:
        """Atomically publish the record (data must already be on disk)."""
        p = self.record_path(rec.partition_key)
        tmp = p + ".tmp"
        body = rec.to_json()
        body["finished_at"] = time.time()
        with open(tmp, "w") as f:
            json.dump(body, f)
        os.replace(tmp, p)

    def records(self) -> list[dict]:
        out = []
        for name in sorted(os.listdir(self.manifest_dir)):
            if name.endswith(".json"):
                with open(os.path.join(self.manifest_dir, name)) as f:
                    out.append(json.load(f))
        return out


def resumable_write(
    out_dir: str,
    stage: str,
    partitions: dict,
    dataset_factory,
    fingerprint,
) -> dict:
    """Write one parquet directory per partition, skipping finished ones.

    partitions: key -> partition spec (opaque, passed to the factory).
    dataset_factory(key, spec) -> ray.data.Dataset for that partition.
    fingerprint: str | callable(key, spec) -> str identifying the INPUT.

    Returns {"written": [...], "skipped": [...]}. Each partition is written
    with Ray's parallel writer (many files per partition is fine); the
    manifest record commits only after write_parquet returns, making the
    whole output resumable at partition granularity.
    """
    manifest = LineageManifest(out_dir, stage)
    written, skipped = [], []
    for key, spec in partitions.items():
        fp = fingerprint(key, spec) if callable(fingerprint) else fingerprint
        if manifest.done(key, fp):
            skipped.append(key)
            continue
        part_dir = os.path.join(out_dir, f"part={key}")
        # A (re)computed partition must start from an empty directory: Ray's
        # write_parquet names files with a per-execution UUID, so leftovers
        # from a crashed attempt (data written, manifest not committed) or a
        # fingerprint-invalidated previous run would otherwise survive next
        # to the new files and read_resumable would return duplicate rows.
        if os.path.isdir(part_dir):
            import shutil as _shutil

            _shutil.rmtree(part_dir)
        os.makedirs(part_dir, exist_ok=True)
        t0 = time.time()
        ds = dataset_factory(key, spec)
        ds.write_parquet(part_dir)
        # row count from the written files' footers — never re-execute the
        # pipeline for metrics
        import glob as _glob

        import pyarrow.parquet as pq

        n_rows = sum(
            pq.ParquetFile(f).metadata.num_rows
            for f in _glob.glob(os.path.join(part_dir, "*.parquet"))
        )
        manifest.commit(
            PartitionRecord(
                stage=stage,
                partition_key=str(key),
                input_fingerprint=fp,
                output_path=part_dir,
                metrics={"rows": n_rows, "seconds": round(time.time() - t0, 3)},
            )
        )
        written.append(key)
    return {"written": written, "skipped": skipped}


def read_resumable(out_dir: str):
    """Read back all finished partitions as one Dataset."""
    import glob as _glob

    import ray.data

    files = sorted(_glob.glob(os.path.join(out_dir, "part=*", "*.parquet")))
    return ray.data.read_parquet(files)
