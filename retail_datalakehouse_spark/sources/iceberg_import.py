"""Iceberg metadata READER — the import half of the Iceberg interop
surface (`VersionedTable.export_iceberg_metadata` is the writer): open a
table whose ``metadata/`` tree follows the Iceberg v2 structure and
materialize any snapshot as a DataFrame.

Deliberately independent of VersionedTable: it consumes only the
exported metadata format — version-hint.text -> v<N>.metadata.json ->
one snapshot -> its manifest list -> manifests -> live data files —
which is exactly the resolution path an Iceberg engine walks. The key
DESIGN difference from Delta this module makes tangible: an Iceberg
read never replays a log. Each snapshot is self-contained (its manifest
list names every live file), so time travel is "pick a different
snapshot object", O(1) metadata choices + O(live files) listing, not
O(history) action replay. The trade is on the write side: Delta appends
a diff commit; Iceberg rewrites a (tiny) metadata json + reuses
manifests by reference.

Scale notes: snapshot resolution is driver-side O(manifests + files)
JSON — the same planning cost an Iceberg engine pays, and the manifest
LIST layer exists precisely so planning can prune whole manifests by
their summary counts/bounds before opening them. The data read is one
parquet scan over exactly the live file set. This reader consumes the
exporter's documented JSON stand-in for Avro manifests (the container
has no Avro tooling); the structure, field names, entry statuses, and
resolution algorithm are the spec's.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# Iceberg primitive -> Spark type (inverse of the exporter's map)
_SPARK_TYPES = {
    "boolean": T.BooleanType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "date": T.DateType(),
    "timestamptz": T.TimestampType(),
    "timestamp": T.TimestampNTZType(),
    "string": T.StringType(),
    "binary": T.BinaryType(),
}


def _spark_schema(ice_schema: dict) -> T.StructType:
    """Iceberg schema JSON -> Spark StructType. The read schema is the
    METADATA's contract (field ids + declared types), never parquet
    inference — the type-evolution guarantee external readers rely on."""
    fields = []
    for f in ice_schema["fields"]:
        tn = f["type"]
        if isinstance(tn, str) and tn.startswith("decimal"):
            p, s = tn[tn.index("(") + 1 : tn.rindex(")")].split(",")
            dt: T.DataType = T.DecimalType(int(p), int(s))
        elif isinstance(tn, str) and tn in _SPARK_TYPES:
            dt = _SPARK_TYPES[tn]
        else:
            raise ValueError(f"unsupported iceberg type {tn!r}")
        fields.append(T.StructField(f["name"], dt, not f["required"]))
    return T.StructType(fields)


def load_table_metadata(table_root: str) -> dict:
    """Resolve the CURRENT metadata file via version-hint.text (the
    HadoopCatalog convention the exporter writes)."""
    meta_dir = os.path.join(table_root, "metadata")
    hint = os.path.join(meta_dir, "version-hint.text")
    if not os.path.exists(hint):
        raise ValueError(f"no iceberg metadata (version-hint.text) under {table_root}")
    with open(hint) as fh:
        n = int(fh.read().strip())
    with open(os.path.join(meta_dir, f"v{n}.metadata.json")) as fh:
        meta = json.load(fh)
    if meta.get("format-version") != 2:
        raise ValueError(f"unsupported iceberg format-version {meta.get('format-version')}")
    return meta


def _live_files(table_root: str, meta: dict, snapshot: dict) -> list[dict]:
    """Snapshot -> manifest list -> manifests -> data_file structs with
    status != DELETED (2). No log replay: this list IS the snapshot."""
    with open(os.path.join(table_root, snapshot["manifest-list"])) as fh:
        manifests = json.load(fh)["manifests"]
    live: list[dict] = []
    for m in manifests:
        # the manifest-list layer lets planning skip manifests that
        # contain no live files at all — prune before opening
        if m["added_files_count"] + m["existing_files_count"] == 0:
            continue
        with open(os.path.join(table_root, m["manifest_path"])) as fh:
            for e in json.load(fh)["entries"]:
                if e["status"] != 2:
                    live.append(e["data_file"])
    return live


def read_iceberg_snapshot(
    spark: SparkSession,
    table_root: str,
    snapshot_id: int | None = None,
    partition_filter: dict | None = None,
) -> DataFrame:
    """Read the Iceberg table at ``table_root`` — the current snapshot,
    or any snapshot in the metadata's ``snapshots`` list by id (time
    travel, Iceberg's ``VERSION AS OF``). Each snapshot is
    self-contained, so travel costs the same one-snapshot resolution as
    a latest read.

    IDENTITY-partitioned tables are supported the Iceberg way: the
    partition columns' values are METADATA-borne (each data_file's
    ``partition`` struct), never read from parquet — this function
    injects them as typed literals per partition group, which is
    exactly the contract that lets ``partition_filter`` (a
    {column: value} dict) prune the FILE LIST before any data I/O
    (Iceberg's partition pruning: planning eliminates files from
    metadata alone; pass it and the scan never lists, opens, or reads
    a pruned partition's files). Transform specs (days/bucket/truncate)
    raise — only identity is exported."""
    meta = load_table_metadata(table_root)
    spec = next(
        s
        for s in meta.get("partition-specs", [{"spec-id": 0, "fields": []}])
        if s["spec-id"] == meta.get("default-spec-id", 0)
    )
    part_cols = [f["name"] for f in spec["fields"]]
    if any(f["transform"] != "identity" for f in spec["fields"]):
        raise ValueError(
            "only identity partition transforms are supported by this reader"
        )
    if partition_filter and not set(partition_filter) <= set(part_cols):
        raise ValueError(
            f"partition_filter keys {sorted(partition_filter)} not all in "
            f"spec columns {part_cols}"
        )
    sid = meta["current-snapshot-id"] if snapshot_id is None else snapshot_id
    snaps = {s["snapshot-id"]: s for s in meta["snapshots"]}
    if sid not in snaps:
        raise ValueError(f"snapshot {sid} not in {table_root} (have {sorted(snaps)})")
    files = _live_files(table_root, meta, snaps[sid])
    if partition_filter:
        # metadata-only pruning: compare as strings (values are stored
        # as the hive path rendering)
        files = [
            f
            for f in files
            if all(
                str(f["partition"].get(k)) == str(v)
                for k, v in partition_filter.items()
            )
        ]
    if not files:
        raise ValueError(
            f"snapshot {sid} has no live data files"
            + (f" matching {partition_filter}" if partition_filter else "")
        )
    # Resolve the schema by MATCHING schema-id (the schemas list is
    # append-only but position is not contractual), preferring the
    # snapshot's OWN schema-id: time travel must read an old snapshot
    # under the schema it was written with, not the current one.
    wanted = snaps[sid].get("schema-id", meta["current-schema-id"])
    ice = next(
        (s for s in meta["schemas"] if s["schema-id"] == wanted), None
    )
    if ice is None:
        raise ValueError(f"schema-id {wanted} not in {table_root} metadata")
    schema = _spark_schema(ice)
    if not part_cols:
        paths = [os.path.join(table_root, f["file_path"]) for f in files]
        return spark.read.schema(schema).parquet(*paths)

    # identity-partitioned: group files by partition tuple, read each
    # group under the FILE schema (partition columns are not in the
    # parquet), inject the metadata values as typed literals, and union
    # — making the 'values come from metadata' contract literal.
    from pyspark.sql import functions as F

    by_name = {f.name: f for f in schema.fields}
    file_schema = T.StructType(
        [f for f in schema.fields if f.name not in part_cols]
    )
    groups: dict[tuple, list[str]] = {}
    for f in files:
        key = tuple(f["partition"].get(c) for c in part_cols)
        groups.setdefault(key, []).append(
            os.path.join(table_root, f["file_path"])
        )
    out: DataFrame | None = None
    for key, paths in sorted(groups.items(), key=lambda kv: str(kv[0])):
        df = spark.read.schema(file_schema).parquet(*paths)
        for c, raw in zip(part_cols, key):
            df = df.withColumn(
                c, F.lit(raw).cast(by_name[c].dataType)
            )
        df = df.select(*[f.name for f in schema.fields])
        out = df if out is None else out.unionByName(df)
    return out


def iceberg_snapshot_summary(table_root: str) -> dict:
    """Zero-data-read table facts from metadata alone — the planning
    numbers an Iceberg catalog UI shows: snapshot lineage, per-snapshot
    live file/row counts (manifest-list summary arithmetic, no manifest
    opened for rows), and total metadata file count."""
    meta = load_table_metadata(table_root)
    out: dict = {
        "n_snapshots": len(meta["snapshots"]),
        "current_snapshot_id": meta["current-snapshot-id"],
        "lineage": [],
    }
    for s in meta["snapshots"]:
        with open(os.path.join(table_root, s["manifest-list"])) as fh:
            ms = json.load(fh)["manifests"]
        out["lineage"].append(
            {
                "snapshot_id": s["snapshot-id"],
                "parent": s.get("parent-snapshot-id"),
                "sequence_number": s["sequence-number"],
                "operation": s["summary"]["operation"],
                "live_files": sum(
                    m["added_files_count"] + m["existing_files_count"] for m in ms
                ),
                "live_rows": sum(
                    m["added_rows_count"] + m["existing_rows_count"] for m in ms
                ),
                "deleted_files": sum(m["deleted_files_count"] for m in ms),
            }
        )
    return out
