"""Stage checkpoints + lineage for resumable index builds.

Emulates Iceberg snapshot checkpoints (no Iceberg catalog in the sandbox) with
Parquet stage outputs + a JSON manifest, per SURVEY.md §7.4(4): monotone
snapshot ids, idempotent restart. The reference's durability analog is the
KVS append-only `.table` log replayed at startup
(searchEngine/src/cis5550/kvs/Worker.java:160-195,498-528); ours is
coarse-grained (per stage) because Spark re-executes within a stage for free.

Manifest shape:
{
  "snapshots": [{"snapshot_id": 1, "stage": "docs", "rows": N,
                 "wall_s": ..., "metrics": {...}}, ...],
  "completed": {"docs": {...}, "index": {...}}
}

Lineage rows (one per partition per stage) land in `<out>/_lineage` parquet:
stage, partition_id, docs_processed, postings_emitted, bytes_compressed.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Any

MANIFEST = "manifest.json"


class BuildManifest:
    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.path = os.path.join(out_dir, MANIFEST)
        os.makedirs(out_dir, exist_ok=True)
        if os.path.exists(self.path):
            with open(self.path) as f:
                self.state = json.load(f)
        else:
            self.state = {"snapshots": [], "completed": {}}

    def is_complete(self, stage: str) -> bool:
        """Stage counts as done only if manifest says so AND its parquet
        output survived (a _SUCCESS marker written by Spark); manifest-only
        stages (has_output=False) need no directory."""
        snap = self.state["completed"].get(stage)
        if snap is None:
            return False
        if not snap.get("has_output", True):
            return True
        out = self.stage_path(stage)
        return os.path.exists(os.path.join(out, "_SUCCESS"))

    def stage_path(self, stage: str) -> str:
        return os.path.join(self.out_dir, stage)

    def begin(self, stage: str) -> float:
        """Clear any partial output of an incomplete stage (idempotence)."""
        out = self.stage_path(stage)
        if not self.is_complete(stage) and os.path.exists(out):
            shutil.rmtree(out)
        return time.time()

    def commit(self, stage: str, t0: float, rows: int,
               metrics: dict[str, Any] | None = None,
               has_output: bool = True) -> None:
        snap = {
            "snapshot_id": len(self.state["snapshots"]) + 1,
            "stage": stage,
            "rows": int(rows),
            "wall_s": round(time.time() - t0, 3),
            "metrics": metrics or {},
            "has_output": has_output,
        }
        self.state["snapshots"].append(snap)
        self.state["completed"][stage] = snap
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.state, f, indent=1)
        os.replace(tmp, self.path)  # atomic manifest swap

    def metrics(self) -> dict[str, Any]:
        return {s["stage"]: s for s in self.state["snapshots"]}
