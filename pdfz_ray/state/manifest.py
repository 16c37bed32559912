"""Checkpoint manifest + per-partition lineage (SURVEY.md §4 resume row).

The reference's resume story is implicit and lossy: a Redis in-flight key
with TTL 3600 plus output-file clobbering (api/src/server.ts:90-103,
extractor/src/helper/file_helper.rs:67-73). The rebuild makes it explicit:

- output is partitioned — one directory per input partition
  (``part-{i:05d}``), written to a temp dir and atomically renamed;
- a manifest line (JSON) is appended per *completed* partition with its
  lineage metrics (docs, pages, decode_failures, empty_pages, wall_s);
- resume = skip partitions already in the manifest (the anti-join of the
  input partition list against the manifest — driver-side, the manifest is
  tiny even at 10^12 docs because partitions are coarse).

This gives effectively-exactly-once output on top of Ray's at-least-once
task retries: a partition directory is only visible once its rename
committed, and the rename commits only after every block of the partition
was written.
"""

from __future__ import annotations

import json
import os
import shutil
import time


class Manifest:
    """Append-only JSONL manifest of completed partitions."""

    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.path = os.path.join(out_dir, "_manifest.jsonl")
        os.makedirs(out_dir, exist_ok=True)

    def completed(self) -> dict[int, dict]:
        done: dict[int, dict] = {}
        if os.path.exists(self.path):
            with open(self.path) as f:
                for line in f:
                    line = line.strip()
                    if not line:
                        continue
                    row = json.loads(line)
                    if row.get("status") == "done":
                        done[int(row["partition_id"])] = row
        return done

    def partition_dir(self, pid: int) -> str:
        return os.path.join(self.out_dir, f"part-{pid:05d}")

    def temp_dir(self, pid: int) -> str:
        return os.path.join(self.out_dir, f".tmp-part-{pid:05d}")

    def begin(self, pid: int) -> str:
        """Fresh temp dir for the partition's writes (stale tmp purged)."""
        tmp = self.temp_dir(pid)
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        os.makedirs(tmp)
        return tmp

    def commit(self, pid: int, metrics: dict) -> None:
        """Atomic rename + manifest append = the partition's commit point."""
        final = self.partition_dir(pid)
        if os.path.exists(final):
            shutil.rmtree(final)  # re-run of an uncommitted partition
        os.rename(self.temp_dir(pid), final)
        row = {
            "partition_id": pid,
            "status": "done",
            "committed_at": time.time(),
            **metrics,
        }
        with open(self.path, "a") as f:
            f.write(json.dumps(row) + "\n")

    def output_dirs(self) -> list[str]:
        return [self.partition_dir(pid) for pid in sorted(self.completed())]

    def output_files(self) -> list[str]:
        """All committed parquet files (ray.data.read_parquet-ready)."""
        import glob

        files: list[str] = []
        for d in self.output_dirs():
            files.extend(sorted(glob.glob(os.path.join(d, "*.parquet"))))
        return files
