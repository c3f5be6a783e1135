"""Delta transaction-log READER — the import half of the interop surface
(`VersionedTable.export_delta_log` is the writer): open any table whose
``_delta_log`` follows the public Delta protocol and materialize a
snapshot as a DataFrame, at the latest commit or any earlier one
(time travel by log replay).

Deliberately independent of VersionedTable: it reads ONLY the public log
format (JSON actions, %020d commit files), exactly what delta-rs or
duckdb's delta extension would do, so it works on foreign Delta tables
too — scoped to what the minimal protocol guarantees: plain-parquet adds
plus identity-partitioned layouts whose values ride each add's
``partitionValues`` string map (column-mapped/DV-bearing tables need
reader features this module refuses rather than misreads).

Scale notes: log replay is driver-side O(actions) JSON — the same cost a
Delta reader pays before its first byte of data; the data read itself is
one parquet scan over exactly the live file set (Spark still prunes
row groups inside those files from parquet footers). Classic parquet
checkpoints are supported the spec's way: ``_last_checkpoint`` names the
checkpoint, the reader seeds its state from it and replays only the JSON
commits after — O(commits-since-checkpoint) on a long-lived log, and the
only resolution path once retention truncates pre-checkpoint commits.
"""

from __future__ import annotations

import json
import os
from urllib.parse import unquote

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def _commit_files(log_dir: str) -> list[str]:
    return sorted(
        fn
        for fn in os.listdir(log_dir)
        if len(fn) == 25 and fn.endswith(".json") and fn[:20].isdigit()
    )


def _read_checkpoint(log_dir: str):
    """Consult ``_last_checkpoint`` (the spec's reader entry point) and
    load the classic parquet checkpoint it names. Returns
    (version, live_adds, schema_str, part_cols) or None when the log has
    no checkpoint. pyarrow read — O(actions), no Spark job."""
    ptr = os.path.join(log_dir, "_last_checkpoint")
    if not os.path.exists(ptr):
        return None
    import pyarrow.parquet as pq

    with open(ptr) as fh:
        cp_ver = int(json.load(fh)["version"])
    cp_path = os.path.join(log_dir, f"{cp_ver:020d}.checkpoint.parquet")
    live: dict[str, dict] = {}
    schema_str = None
    part_cols: list[str] = []
    for row in pq.read_table(cp_path).to_pylist():
        if row.get("protocol"):
            if (row["protocol"].get("minReaderVersion") or 1) > 1:
                raise ValueError(
                    "table requires Delta reader features beyond plain "
                    "parquet (minReaderVersion > 1)"
                )
        elif row.get("metaData"):
            schema_str = row["metaData"]["schemaString"]
            part_cols = list(row["metaData"].get("partitionColumns") or [])
        elif row.get("add"):
            add = dict(row["add"])
            # pyarrow reads map<string,string> back as a list of pairs
            pv = add.get("partitionValues")
            if isinstance(pv, list):
                add["partitionValues"] = dict(pv)
            live[unquote(add["path"])] = add
    return cp_ver, live, schema_str, part_cols


def read_delta_snapshot(
    spark: SparkSession,
    table_root: str,
    version: int | None = None,
    partition_filter: dict | None = None,
) -> DataFrame:
    """Read the Delta table at ``table_root`` — latest commit, or the
    state as of delta commit ``version`` (inclusive) for time travel.

    Replays protocol/metaData/add/remove actions across the commit files
    in filename order (the Delta reconciliation rule: a later ``remove``
    cancels an earlier ``add`` of the same path), then hands Spark the
    surviving file list with the log's own ``schemaString`` (so the read
    schema is the LOG's contract, not parquet inference — exactly how a
    Delta reader resolves column types after widening).

    PARTITIONED tables (identity hive layouts) resolve the Delta way:
    partition column values come from each add's ``partitionValues``
    string map — never from the parquet (the files don't contain the
    column) — injected as typed literals per partition group, and
    ``partition_filter`` ({column: value}) prunes the FILE LIST during
    log replay, before any data I/O (Delta's partition pruning)."""
    log_dir = os.path.join(table_root, "_delta_log")
    if not os.path.isdir(log_dir):
        raise ValueError(f"no _delta_log under {table_root}")
    commits = _commit_files(log_dir)
    cp = _read_checkpoint(log_dir)
    live: dict[str, dict] = {}
    schema_str = None
    part_cols: list[str] = []
    if cp is not None and (version is None or version >= cp[0]):
        # spec behavior: seed state from the checkpoint, replay only the
        # JSON commits AFTER it — O(commits-since-checkpoint)
        cp_ver, live, schema_str, part_cols = cp
        live = dict(live)
        commits = [fn for fn in commits if int(fn[:20]) > cp_ver]
        if version is not None:
            commits = [fn for fn in commits if int(fn[:20]) <= version]
    else:
        if not commits:
            raise ValueError(
                f"no JSON commits in {log_dir} and no checkpoint to seed "
                f"from"
            )
        if version is not None:
            commits = [fn for fn in commits if int(fn[:20]) <= version]
            if not commits or int(commits[-1][:20]) != version:
                raise ValueError(
                    f"delta commit {version} not found in {log_dir}"
                )
        if int(commits[0][:20]) != 0:
            raise ValueError(
                f"log at {log_dir} starts at commit {int(commits[0][:20])} "
                f"(earlier commits expired by checkpoint retention); "
                f"versions below the checkpoint are no longer resolvable"
            )
    for fn in commits:
        with open(os.path.join(log_dir, fn)) as fh:
            for line in fh:
                a = json.loads(line)
                if "add" in a:
                    live[unquote(a["add"]["path"])] = a["add"]
                elif "remove" in a:
                    live.pop(unquote(a["remove"]["path"]), None)
                elif "metaData" in a:
                    md = a["metaData"]
                    part_cols = md.get("partitionColumns", [])
                    schema_str = md["schemaString"]
                elif "protocol" in a:
                    if a["protocol"].get("minReaderVersion", 1) > 1:
                        raise ValueError(
                            "table requires Delta reader features beyond "
                            "plain parquet (minReaderVersion > 1)"
                        )
    if schema_str is None:
        raise ValueError(f"log at {log_dir} carries no metaData action")
    if partition_filter and not set(partition_filter) <= set(part_cols):
        raise ValueError(
            f"partition_filter keys {sorted(partition_filter)} not all in "
            f"partitionColumns {part_cols}"
        )
    if partition_filter:
        live = {
            rel: add
            for rel, add in live.items()
            if all(
                str(add.get("partitionValues", {}).get(k)) == str(v)
                for k, v in partition_filter.items()
            )
        }
    schema = StructType.fromJson(json.loads(schema_str))
    if not live:
        return spark.createDataFrame([], schema)
    if not part_cols:
        paths = [os.path.join(table_root, rel) for rel in live]
        return spark.read.schema(schema).parquet(*paths)

    # partitioned: metadata-borne values injected per partition group
    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType as _St

    by_name = {f.name: f for f in schema.fields}
    file_schema = _St([f for f in schema.fields if f.name not in part_cols])
    groups: dict[tuple, list[str]] = {}
    for rel, add in live.items():
        pv = add.get("partitionValues", {})
        key = tuple(pv.get(c) for c in part_cols)
        groups.setdefault(key, []).append(os.path.join(table_root, rel))
    out: DataFrame | None = None
    for key, paths in sorted(groups.items(), key=lambda kv: str(kv[0])):
        df = spark.read.schema(file_schema).parquet(*paths)
        for c, raw in zip(part_cols, key):
            df = df.withColumn(c, F.lit(raw).cast(by_name[c].dataType))
        df = df.select(*[f.name for f in schema.fields])
        out = df if out is None else out.unionByName(df)
    return out


def delta_log_summary(table_root: str) -> dict:
    """Driver-side log inspection: commit count, live/removed file counts,
    and the row total from add-file stats — the zero-data-read health
    check a sync monitor runs."""
    log_dir = os.path.join(table_root, "_delta_log")
    commits = _commit_files(log_dir)
    live: dict[str, dict] = {}
    n_removes = 0
    for fn in commits:
        with open(os.path.join(log_dir, fn)) as fh:
            for line in fh:
                a = json.loads(line)
                if "add" in a:
                    live[unquote(a["add"]["path"])] = a["add"]
                elif "remove" in a:
                    live.pop(unquote(a["remove"]["path"]), None)
                    n_removes += 1
    n_rows = 0
    for add in live.values():
        st = json.loads(add.get("stats") or "{}")
        if st.get("numRecords") is not None:
            n_rows += st["numRecords"]
    return {
        "n_commits": len(commits),
        "n_live_files": len(live),
        "n_removed": n_removes,
        "n_rows_from_stats": n_rows,
    }
