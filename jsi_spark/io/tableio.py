"""Snapshot-committed table layer: parquet + JSON manifest.

No Iceberg runtime jar ships in this sandbox (SURVEY.md §7.0), so this
implements the subset of Iceberg's semantics the engine relies on, behind
one small interface:

- a table = a directory of immutable parquet *batch* directories;
- a manifest (JSON, atomically renamed into place) lists committed
  batches — readers see ONLY committed data (snapshot isolation);
- a failed job leaves orphan batch dirs that no manifest references:
  harmless, cleaned lazily.

On a real cluster this class is swapped for Iceberg catalog tables
(``spark.read.format("iceberg")``); everything above this interface is
unchanged.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


class SnapshotTable:
    def __init__(self, root: str, name: str):
        self.dir = os.path.join(root, name)
        self.manifest_path = os.path.join(self.dir, "manifest.json")
        os.makedirs(self.dir, exist_ok=True)

    # -- manifest ------------------------------------------------------------

    def manifest(self) -> dict:
        if not os.path.exists(self.manifest_path):
            return {"snapshots": []}
        with open(self.manifest_path) as f:
            return json.load(f)

    def _write_manifest(self, m: dict) -> None:
        tmp = self.manifest_path + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(m, f, indent=1)
        os.replace(tmp, self.manifest_path)  # atomic commit

    def committed_batches(self) -> list[str]:
        return [b for s in self.manifest()["snapshots"]
                for b in s["batches"]]

    def snapshot_ids(self) -> list[str]:
        return [s["snapshot_id"] for s in self.manifest()["snapshots"]]

    # -- write (staged) / commit ----------------------------------------------

    def stage_batch(self, df: DataFrame) -> str:
        """Write a new batch dir; NOT visible until commit()."""
        batch = f"batch-{uuid.uuid4().hex[:12]}"
        df.write.mode("overwrite").parquet(os.path.join(self.dir, batch))
        return batch

    def commit(self, batches: list[str], meta: dict | None = None) -> str:
        m = self.manifest()
        snapshot_id = f"snap-{len(m['snapshots']):06d}-{uuid.uuid4().hex[:8]}"
        m["snapshots"].append({
            "snapshot_id": snapshot_id,
            "batches": batches,
            "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                          time.gmtime()),
            "meta": meta or {},
        })
        self._write_manifest(m)
        return snapshot_id

    def append(self, df: DataFrame, meta: dict | None = None) -> str:
        return self.commit([self.stage_batch(df)], meta)

    # -- read -----------------------------------------------------------------

    def read(self, spark: SparkSession) -> DataFrame | None:
        batches = self.committed_batches()
        if not batches:
            return None
        return spark.read.parquet(
            *[os.path.join(self.dir, b) for b in batches])
