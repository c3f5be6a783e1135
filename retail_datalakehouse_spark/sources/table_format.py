"""Versioned-table format: Delta/Iceberg-style snapshot semantics on plain
parquet (SURVEY §2.1 S6/S7; BASELINE.json "table format operations").

Delta/Iceberg are not on this classpath, so the engine ships a minimal
log-structured table format with the same *operational* surface:

- every write is a new immutable **snapshot** (parquet under
  ``_v<N>/``) committed by atomically writing a manifest entry;
- readers resolve the manifest → **snapshot isolation** (a reader never
  sees a half-written version) and **time travel**
  (``read_version(n)``);
- ``append`` / ``overwrite`` / ``merge`` (upsert on keys) are the three
  commit types, mirroring Delta's write modes + MERGE INTO;
- the manifest records per-version lineage (parent, operation, row count)
  — the audit trail a lakehouse needs for reproducible training-data
  snapshots.

The commit protocol is write-data-then-rename-manifest: the manifest file
``_manifest/v<N>.json`` is created only after the snapshot directory is
fully written, and the "current" version is simply the highest committed N
(rename/create is atomic on POSIX and object stores with atomic put).
This is exactly Delta's log-append idea minus optimistic-concurrency
conflict checking (single-writer assumption — document it, don't fake it).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession

from ..operators.merge import merge_upsert, merge_upsert_latest


class VersionedTable:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self._manifest_dir = os.path.join(path, "_manifest")

    # ----------------------------------------------------------- manifest

    def _versions(self) -> list[int]:
        if not os.path.isdir(self._manifest_dir):
            return []
        out = []
        for f in os.listdir(self._manifest_dir):
            if f.startswith("v") and f.endswith(".json"):
                out.append(int(f[1:-5]))
        return sorted(out)

    def current_version(self) -> int | None:
        vs = self._versions()
        return vs[-1] if vs else None

    def history(self) -> list[dict]:
        return [
            json.load(open(os.path.join(self._manifest_dir, f"v{v}.json")))
            for v in self._versions()
        ]

    def _commit(self, df: DataFrame, op: str) -> int:
        v = (self.current_version() or 0) + 1
        data_dir = os.path.join(self.path, f"_v{v}")
        df.write.mode("overwrite").parquet(data_dir)  # data first …
        os.makedirs(self._manifest_dir, exist_ok=True)
        n_rows = self.spark.read.parquet(data_dir).count()
        entry = {
            "version": v,
            "operation": op,
            "parent": v - 1 if v > 1 else None,
            "n_rows": n_rows,
            "committed_at": time.time(),
        }
        tmp = os.path.join(self._manifest_dir, f".v{v}.json.tmp")
        with open(tmp, "w") as f:
            json.dump(entry, f)
        os.rename(tmp, os.path.join(self._manifest_dir, f"v{v}.json"))  # … commit last
        return v

    # ------------------------------------------------------------- writes

    def overwrite(self, df: DataFrame) -> int:
        return self._commit(df, "overwrite")

    def append(self, df: DataFrame) -> int:
        cur = self.read()
        out = df if cur is None else cur.unionByName(df)
        return self._commit(out, "append")

    def merge(self, updates: DataFrame, keys: list[str], order_by: list | None = None) -> int:
        """MERGE INTO: update matched keys, insert new (S7 on a table).

        With ``order_by`` (names or Column expressions), the merge is
        conditional — ``WHEN MATCHED AND update is first under order_by
        THEN UPDATE`` — so replaying out-of-order micro-batches cannot
        regress a key to an older row (the streaming-upsert contract)."""
        from ..operators.dedup import dedup_keep_first

        cur = self.read()
        if cur is None:
            merged = dedup_keep_first(updates, keys, order_by) if order_by else updates
        elif order_by:
            merged = merge_upsert_latest(cur, updates, keys, order_by)
        else:
            merged = merge_upsert(cur, updates, keys)
        return self._commit(merged, "merge")

    # -------------------------------------------------------------- reads

    def read(self) -> DataFrame | None:
        v = self.current_version()
        return None if v is None else self.read_version(v)

    def read_version(self, version: int) -> DataFrame:
        """Time travel: read any committed snapshot."""
        if version not in self._versions():
            raise ValueError(f"version {version} not committed at {self.path}")
        return self.spark.read.parquet(os.path.join(self.path, f"_v{version}"))


def compact(table: VersionedTable, target_partitions: int = 8) -> int:
    """Small-files compaction (the lakehouse maintenance op): rewrite the
    current snapshot into ``target_partitions`` right-sized files as a new
    version. Readers keep snapshot isolation throughout — time travel to
    pre-compaction versions still works; only file layout changes.

    At 100 TB this is the scheduled OPTIMIZE job: streaming/micro-batch
    ingest produces many small files (one per trigger per partition);
    scans then pay per-file open + footer costs. Compaction restores
    scan-efficient file sizes without changing table contents.
    """
    cur = table.read()
    if cur is None:
        raise ValueError("cannot compact an empty table")
    return table._commit(cur.repartition(target_partitions), "compact")
