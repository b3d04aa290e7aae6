"""Parquet-backed warehouse with manifest commits — Iceberg-shaped storage
without the Iceberg jars (not in this image; the layout and commit protocol
are designed so swapping `Warehouse` for an Iceberg catalog is a one-file
change: same table names, same partition columns, same snapshot semantics).

Commit protocol (atomic, resumable):
- writers land parquet under ``<table>/snap-<n>/`` (Spark writes + _SUCCESS)
- ``_manifest.json`` names the ONE live snapshot dir plus watermark and
  lineage entries; readers only ever read the snapshot the manifest names
- a commit = write new snapshot dir, then atomically replace the manifest
  (os.replace). A crash before the manifest swap leaves the old snapshot
  live; re-running the (deterministic) job re-creates the same new
  snapshot — which is what makes tier promotion checkpoint-resumable.

Partitioning: chunk/tier tables carry a ``p_day`` column (UTC day of
window_start) used as the physical partition key — the analogue of
Iceberg ``days(window_start)`` — so TTL retention is a partition drop and
time-range queries prune at the directory level. At 100 TB you would add
``bucket(doc_id, N)`` as a second partition level; locally one level is
enough to prove pruning.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

US_PER_DAY = 86_400_000_000


class Warehouse:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- manifest ---------------------------------------------------------
    def _manifest_path(self, table: str) -> str:
        return os.path.join(self.root, table, "_manifest.json")

    def manifest(self, table: str) -> dict:
        p = self._manifest_path(table)
        if not os.path.exists(p):
            return {"snapshot": None, "version": 0, "watermark_us": None, "lineage": []}
        with open(p) as f:
            return json.load(f)

    def _commit(self, table: str, snapshot_dir: str, watermark_us: int | None,
                lineage_entry: dict) -> None:
        m = self.manifest(table)
        old_snap = m["snapshot"]
        m["snapshot"] = snapshot_dir
        m["version"] += 1
        if watermark_us is not None:
            m["watermark_us"] = watermark_us
        m["lineage"] = (m["lineage"] + [dict(lineage_entry, ts=time.time(),
                                             version=m["version"])])[-50:]
        tmp = self._manifest_path(table) + ".tmp"
        os.makedirs(os.path.dirname(tmp), exist_ok=True)
        with open(tmp, "w") as f:
            json.dump(m, f, indent=1)
        os.replace(tmp, self._manifest_path(table))  # the atomic commit point
        if old_snap and old_snap != snapshot_dir:
            shutil.rmtree(os.path.join(self.root, table, old_snap), ignore_errors=True)

    # -- io ----------------------------------------------------------------
    def write(self, df: DataFrame, table: str, *, partition_by: tuple[str, ...] = (),
              watermark_us: int | None = None, op: str = "overwrite") -> None:
        m = self.manifest(table)
        snap = f"snap-{m['version'] + 1}"
        path = os.path.join(self.root, table, snap)
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(path)
        self._commit(table, snap, watermark_us, {"op": op, "partition_by": partition_by})

    def read(self, spark: SparkSession, table: str) -> DataFrame:
        m = self.manifest(table)
        if m["snapshot"] is None:
            raise FileNotFoundError(f"table {table} has no committed snapshot")
        return spark.read.parquet(os.path.join(self.root, table, m["snapshot"]))

    def exists(self, table: str) -> bool:
        return self.manifest(table)["snapshot"] is not None

    def reset_watermark(self, table: str) -> None:
        """Invalidate a tier's promotion watermark (e.g. after an append of
        data that may fall below it); the next promotion recomputes fully —
        deterministic and idempotent, so correctness is unaffected."""
        if not self.exists(table):
            return
        m = self.manifest(table)
        m["watermark_us"] = None
        tmp = self._manifest_path(table) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f, indent=1)
        os.replace(tmp, self._manifest_path(table))

    def watermark(self, table: str) -> int | None:
        return self.manifest(table)["watermark_us"]


def with_p_day(df: DataFrame, ts_col: str = "window_start") -> DataFrame:
    return df.withColumn("p_day", (F.col(ts_col) / F.lit(US_PER_DAY)).cast("bigint"))
