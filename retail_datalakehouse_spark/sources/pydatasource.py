"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API) —
the connector surface for sources no built-in format covers (internal
APIs, generators, bespoke wire formats).

`synth_events` is a deterministic event generator exercising the full
contract: schema declaration, option parsing, PARTITION PLANNING (the
source tells Spark how to parallelize itself — each `InputPartition`
generates only its slice, so a 1000-executor cluster fans the scan out
with zero driver materialization), and per-partition iteration. Rows are
a pure function of `event_id`, so any reader at any parallelism produces
the identical table — the property the oracle checks.

Cf. the reference's ad-hoc boto3 ingest scripts
(`/root/reference/scripts/s3_bucket.py`): here ingestion is a first-class
Spark source with planning and pushed-down row budgets instead of a
driver-side loop.
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

#: multiplicative hash constant shared with the DuckDB oracles
_MULT = 2654435761


class SynthEventsDataSource(DataSource):
    """``spark.read.format("synth_events").option("rows", N)`` — N rows of
    (event_id, user_id, amount_cents), deterministic in event_id."""

    @classmethod
    def name(cls) -> str:
        return "synth_events"

    def schema(self) -> str:
        return "event_id bigint, user_id bigint, amount_cents bigint"

    def reader(self, schema) -> "SynthEventsReader":
        return SynthEventsReader(
            n_rows=int(self.options.get("rows", 1000)),
            n_partitions=int(self.options.get("partitions", 8)),
        )


class SynthEventsReader(DataSourceReader):
    def __init__(self, n_rows: int, n_partitions: int):
        self.n_rows = n_rows
        self.n_partitions = max(1, min(n_partitions, n_rows or 1))
        # generation range; SynthEventsPushdownReader narrows it
        self.lo, self.hi = 0, n_rows

    def partitions(self):
        # contiguous event_id ranges: the planning step — Spark schedules
        # one task per InputPartition, each generating only its slice.
        # Shard size is fixed from the FULL range, so a pushed-down range
        # predicate visibly shrinks the task count (shards outside the
        # range are never planned), exactly like file pruning on a scan.
        step = -(-self.n_rows // self.n_partitions)  # ceil div
        lo, hi = self.lo, max(self.lo, self.hi)
        if lo >= hi:
            return [InputPartition((0, 0))]  # provably-empty scan
        return [
            InputPartition((p, min(p + step, hi)))
            for p in range(lo - lo % step, hi, step)
        ]

    def read(self, partition: InputPartition):
        lo, hi = partition.value
        # clip the shard to the pushed range (the first/last shard may
        # start before / end after it)
        for eid in range(max(lo, self.lo), min(hi, self.hi)):
            h = (eid * _MULT) % (2**31)
            yield (eid, h % 97, h % 10_000)


class SynthEventsPushdownDataSource(DataSource):
    """``synth_events_pushdown`` — the same generator as ``synth_events``
    with Spark 4.1 FILTER PUSHDOWN. A SEPARATE source on purpose: Spark
    hard-fails ANY reader that implements ``pushFilters`` while
    ``spark.sql.python.filterPushdown.enabled`` is false (the default),
    so attaching pushdown to the base source would break every plain
    read on an untuned session. Callers of this source must enable the
    conf first (s12_datasource_pushdown does, at runtime)."""

    @classmethod
    def name(cls) -> str:
        return "synth_events_pushdown"

    def schema(self) -> str:
        return "event_id bigint, user_id bigint, amount_cents bigint"

    def reader(self, schema) -> "SynthEventsPushdownReader":
        return SynthEventsPushdownReader(
            n_rows=int(self.options.get("rows", 1000)),
            n_partitions=int(self.options.get("partitions", 8)),
        )


class SynthEventsPushdownReader(SynthEventsReader):
    def pushFilters(self, filters):
        """Range/point predicates on ``event_id`` — the source's seed
        column — narrow the GENERATION range itself, so planning emits
        only the shards that can contain matches (the connector analogue
        of partition pruning against a sharded upstream). Fully-applied
        filters are consumed (not yielded back), so Spark drops its
        residual Filter; anything else is yielded back for Spark to
        evaluate post-scan."""
        for f in filters:
            rng = None
            if (
                isinstance(
                    f,
                    (EqualTo, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual),
                )
                and tuple(f.attribute) == ("event_id",)
                and isinstance(f.value, int)
            ):
                if isinstance(f, EqualTo):
                    rng = (f.value, f.value + 1)
                elif isinstance(f, GreaterThan):
                    rng = (f.value + 1, self.hi)
                elif isinstance(f, GreaterThanOrEqual):
                    rng = (f.value, self.hi)
                elif isinstance(f, LessThan):
                    rng = (self.lo, f.value)
                else:  # LessThanOrEqual
                    rng = (self.lo, f.value + 1)
            if rng is None:
                yield f
            else:
                self.lo = max(self.lo, rng[0])
                self.hi = min(self.hi, rng[1])


class SynthEventsStreamDataSource(DataSource):
    """Custom STREAMING source (``simpleStreamReader``): a bounded event
    feed with explicit OFFSET tracking. Spark persists the committed
    offset in the checkpoint; a restarted query resumes at exactly the
    committed position — the exactly-once resume contract a Kafka-like
    connector implements, here in its minimal auditable form. Rows are a
    pure function of event_id (same arithmetic as `synth_events`)."""

    @classmethod
    def name(cls) -> str:
        return "synth_events_stream"

    def schema(self) -> str:
        return "event_id bigint, user_id bigint, amount_cents bigint"

    def simpleStreamReader(self, schema) -> "SynthEventsStreamReader":
        return SynthEventsStreamReader(
            total=int(self.options.get("rows", 60)),
            batch=int(self.options.get("batch", 20)),
        )


def _synth_row(eid: int) -> tuple:
    h = (eid * _MULT) % (2**31)
    return (eid, h % 97, h % 10_000)


class SynthEventsStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, total: int, batch: int):
        self.total, self.batch = total, batch

    def initialOffset(self):
        return {"pos": 0}

    def read(self, start):
        pos = start["pos"]
        end = min(pos + self.batch, self.total)
        return iter([_synth_row(i) for i in range(pos, end)]), {"pos": end}

    def readBetweenOffsets(self, start, end):
        # replay path: a restarted query re-reads the uncommitted range
        return iter([_synth_row(i) for i in range(start["pos"], end["pos"])])


def _cdf_schema_ddl(path: str, table_schema: str | None) -> str:
    """Schema for a CDF stream: the caller's DDL, or — when omitted —
    derived from the latest committed version's FIRST change-feed parquet
    footer (a driver-side metadata read; the CDF files already carry the
    table columns + _change_type, so the footer IS the contract)."""
    if table_schema is not None:
        return f"{table_schema}, _change_type string, _version int"
    import json
    import os

    import pyarrow.parquet as pq

    mdir = os.path.join(path, "_manifest")
    entries = []
    for f in os.listdir(mdir):
        if f.startswith("v") and f.endswith(".json"):
            with open(os.path.join(mdir, f)) as fh:
                e = json.load(fh)
            if "pending_txn_marker" not in e and e.get("cdf_dir"):
                entries.append(e)
    if not entries:
        raise ValueError(
            f"cannot infer CDF schema at {path}: no committed version with a "
            "recorded change feed (pass the tableSchema option, or commit to "
            "a record_cdf table first)"
        )
    latest = max(entries, key=lambda e: e["version"])
    d = os.path.join(path, latest["cdf_dir"])
    first = next(
        os.path.join(root, f)
        for root, _dirs, files in os.walk(d)
        for f in sorted(files)
        if f.endswith(".parquet")
    )
    arrow_to_ddl = {
        "int64": "bigint", "int32": "int", "double": "double",
        "float": "float", "string": "string", "large_string": "string",
        "bool": "boolean", "date32[day]": "date",
    }
    cols = []
    for field in pq.read_schema(first):
        t = str(field.type)
        if t.startswith("timestamp"):
            ddl = "timestamp"
        elif t.startswith("decimal"):
            ddl = t
        else:
            ddl = arrow_to_ddl.get(t)
            if ddl is None:
                raise ValueError(
                    f"cannot map CDF column {field.name!r} type {t} to DDL; "
                    "pass the tableSchema option explicitly"
                )
        cols.append(f"{field.name} {ddl}")
    return ", ".join(cols) + ", _version int"


class VersionedCdfStreamDataSource(DataSource):
    """Stream a :class:`VersionedTable`'s CHANGE FEED — the
    ``spark.readStream.table`` / Delta CDF-streaming analogue, built on
    the same Python DataSource streaming contract as
    `synth_events_stream`: **offsets are table versions**. The committed
    offset in the checkpoint is the last version whose changes were
    delivered; each micro-batch emits the row-level deltas of the
    versions committed since, and a restarted query resumes at exactly
    the committed version — exactly-once change delivery with zero
    snapshot diffing (the deltas were recorded at write time).

    Options: ``path`` (table root), ``tableSchema`` (DDL of the table's
    columns — the source appends ``_change_type string, _version int``).
    Version 1 is delivered as its recorded feed too (a record_cdf
    table's first commit records its rows as inserts), so a consumer
    nets initial-load + changes uniformly.

    Scale note: this is the *simple* (driver-iterating) reader — right
    for bounded maintenance/test feeds. A production variant implements
    the partition-planning ``streamReader`` so each micro-batch's CDF
    files fan out as input partitions; offsets-as-versions and the
    manifest walk are identical.
    """

    @classmethod
    def name(cls) -> str:
        return "versioned_cdf_stream"

    def schema(self) -> str:
        return _cdf_schema_ddl(self.options["path"], self.options.get("tableSchema"))

    def simpleStreamReader(self, schema) -> "VersionedCdfStreamReader":
        return VersionedCdfStreamReader(self.options["path"])


class VersionedCdfStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, path: str):
        self.path = path

    # -- manifest walking (driver-side metadata, no Spark session here) --

    def _versions(self):
        import json
        import os

        mdir = os.path.join(self.path, "_manifest")
        if not os.path.isdir(mdir):
            return {}
        out = {}
        for f in os.listdir(mdir):
            if f.startswith("v") and f.endswith(".json"):
                with open(os.path.join(mdir, f)) as fh:
                    e = json.load(fh)
                if "pending_txn_marker" not in e:  # txn-invisible tail
                    out[e["version"]] = e
        return out

    def _rows_for(self, entry):
        import os

        import pyarrow.parquet as pq

        cdf = entry.get("cdf_dir")
        if cdf is None:
            op = entry.get("operation", "")
            if op in ("rename_column", "drop_column"):
                # schema-changing metadata commit: the stream's schema is
                # fixed at start — silently null-filling renamed columns
                # would be wrong results. Fail with Delta's contract.
                raise ValueError(
                    f"version {entry['version']} ({op}) changed the table "
                    "schema (column mapping); restart the stream with a "
                    "fresh checkpoint to pick up the new schema"
                )
            if op in ("clone", "add_check", "drop_check"):
                # metadata-only commit, zero row changes, schema intact:
                # an EMPTY micro-batch, never a stream failure
                return []
            raise ValueError(
                f"version {entry['version']} ({op}) recorded no "
                "change feed — stream only record_cdf tables (Delta's "
                "readChangeFeed contract)"
            )
        d = os.path.join(self.path, cdf)
        rows = []
        for root, _dirs, files in os.walk(d):
            for f in sorted(files):
                if not f.endswith(".parquet"):
                    continue
                t = pq.read_table(os.path.join(root, f))
                for r in t.to_pylist():
                    r["_version"] = entry["version"]
                    rows.append(tuple(r.values()))
        return rows

    # ----------------------------------------------- offsets-as-versions

    def initialOffset(self):
        return {"v": 0}

    def read(self, start):
        entries = self._versions()
        latest = max(entries, default=0)
        rows = []
        for v in range(start["v"] + 1, latest + 1):
            rows.extend(self._rows_for(entries[v]))
        return iter(rows), {"v": latest}

    def readBetweenOffsets(self, start, end):
        entries = self._versions()
        rows = []
        for v in range(start["v"] + 1, end["v"] + 1):
            rows.extend(self._rows_for(entries[v]))
        return iter(rows)


class VersionedCdfScaleStreamDataSource(DataSource):
    """The PARTITION-PLANNING variant of `versioned_cdf_stream` — the
    same offsets-are-table-versions contract, but implemented on the
    full ``streamReader`` API: each micro-batch's change-feed files
    become ``InputPartition``s, so EXECUTORS read the CDF parquet in
    parallel and the driver touches only manifests (file paths + row
    counts). This is the 100 TB shape: a version that recorded gigabytes
    of deltas fans out as one task per delta file, exactly like a file
    source; the simple variant (driver-iterating) remains the minimal
    reference implementation. Format name: ``versioned_cdf_stream_scale``.
    """

    @classmethod
    def name(cls) -> str:
        return "versioned_cdf_stream_scale"

    def schema(self) -> str:
        return _cdf_schema_ddl(self.options["path"], self.options.get("tableSchema"))

    def streamReader(self, schema) -> "VersionedCdfScaleStreamReader":
        return VersionedCdfScaleStreamReader(self.options["path"])


class _CdfFilePartition(InputPartition):
    def __init__(self, file_path: str, version: int):
        self.file_path = file_path
        self.version = version


class VersionedCdfScaleStreamReader(DataSourceStreamReader):
    def __init__(self, path: str):
        self.path = path

    def _entries(self):
        import json
        import os

        mdir = os.path.join(self.path, "_manifest")
        if not os.path.isdir(mdir):
            return {}
        out = {}
        for f in os.listdir(mdir):
            if f.startswith("v") and f.endswith(".json"):
                with open(os.path.join(mdir, f)) as fh:
                    e = json.load(fh)
                if "pending_txn_marker" not in e:
                    out[e["version"]] = e
        return out

    def initialOffset(self) -> dict:
        return {"v": 0}

    def latestOffset(self) -> dict:
        return {"v": max(self._entries(), default=0)}

    def partitions(self, start: dict, end: dict):
        import os

        parts = []
        entries = self._entries()
        for v in range(start["v"] + 1, end["v"] + 1):
            e = entries[v]
            cdf = e.get("cdf_dir")
            if cdf is None:
                op = e.get("operation", "")
                if op in ("rename_column", "drop_column"):
                    # schema changed mid-stream: fail explicitly (the
                    # fixed stream schema would silently null-fill)
                    raise ValueError(
                        f"version {v} ({op}) changed the table schema "
                        "(column mapping); restart the stream with a "
                        "fresh checkpoint"
                    )
                if op in ("clone", "add_check", "drop_check"):
                    continue  # metadata-only: empty delta, stream flows
                raise ValueError(
                    f"version {v} ({op}) recorded no change feed — "
                    "stream only record_cdf tables"
                )
            d = os.path.join(self.path, cdf)
            for root, _dirs, files in os.walk(d):
                for f in sorted(files):
                    if f.endswith(".parquet"):
                        parts.append(_CdfFilePartition(os.path.join(root, f), v))
        # a batch may cover only empty deltas: Spark requires >=1 partition
        return parts or [_CdfFilePartition("", end["v"])]

    def read(self, partition):
        import pyarrow as pa
        import pyarrow.parquet as pq

        if not partition.file_path:
            return iter(())

        def batches():
            # Arrow RecordBatches straight from the parquet file — the
            # vectorized lane of the DataSource API (no per-row Python
            # objects, no pickling): a gigabyte delta file streams
            # through as columnar buffers with one appended constant
            # column for the version.
            f = pq.ParquetFile(partition.file_path)
            for b in f.iter_batches():
                v = pa.array([partition.version] * b.num_rows, type=pa.int32())
                yield pa.RecordBatch.from_arrays(
                    [*b.columns, v], names=[*b.schema.names, "_version"]
                )

        return batches()

    def commit(self, end: dict) -> None:
        pass  # offsets live in Spark's checkpoint; nothing table-side


# --------------------------------------------------------------- sinks

class _SinkCommit(WriterCommitMessage):
    """Serializable commit message: one staged file per write task."""

    def __init__(self, staged: str, n_rows: int):
        self.staged = staged
        self.n_rows = n_rows


class JsonlSinkDataSource(DataSource):
    """Write-side of the Python DataSource contract (Spark 4
    ``DataSourceArrowWriter`` / ``DataSourceStreamWriter``): an atomic
    JSONL sink with the two-phase protocol real connectors implement —
    executors stage a private file per task and return a commit message;
    the DRIVER publishes all of them (rename into place) only when every
    task succeeded, or deletes the stage on abort, so readers never see
    a torn write. The batch lane is ARROW-NATIVE (RecordBatch in, no
    per-row Python objects); the stream lane adds an idempotent batch
    log — a replayed micro-batch (restart, speculative re-commit) is
    detected by batchId and discarded, the sink-side half of
    exactly-once. Staging and publish share one directory, so the
    rename-based publish assumes the executors and driver see one
    filesystem (local / NFS / fuse-mounted object store); on S3-like
    stores the rename becomes a manifest pointer swap, same protocol.
    Cf. the reference's fire-and-forget boto3 puts
    (/root/reference/scripts/s3_bucket.py) — no atomicity, no abort."""

    @classmethod
    def name(cls):
        return "jsonl_sink"

    def writer(self, schema, overwrite: bool):
        return JsonlArrowWriter(self.options["path"], overwrite)

    def streamWriter(self, schema, overwrite: bool):
        return JsonlStreamWriter(self.options["path"])


class JsonlArrowWriter(DataSourceArrowWriter):
    def __init__(self, path: str, overwrite: bool):
        self.path = path
        self.overwrite = overwrite
        os.makedirs(path, exist_ok=True)

    def write(self, iterator):  # executor-side, Arrow RecordBatches
        import json as _json
        import uuid as _uuid

        staged = os.path.join(self.path, f".staging-{_uuid.uuid4().hex}.jsonl")
        n = 0
        with open(staged, "w") as f:
            for rb in iterator:
                for row in rb.to_pylist():
                    f.write(_json.dumps(row, default=str) + "\n")
                    n += 1
        return _SinkCommit(staged, n)

    def commit(self, messages):  # driver-side, all tasks succeeded
        import uuid as _uuid

        if self.overwrite:
            for old in os.listdir(self.path):
                if old.startswith("part-") and old.endswith(".jsonl"):
                    os.unlink(os.path.join(self.path, old))
            token = ""
        else:
            # append mode: fixed part-{i} names would os.replace (silently
            # clobber) a previous append's files — publish under a
            # per-commit token so appends accumulate
            token = f"-{_uuid.uuid4().hex[:8]}"
        for i, m in enumerate(messages):
            os.replace(
                m.staged, os.path.join(self.path, f"part-{i:05d}{token}.jsonl")
            )

    def abort(self, messages):
        for m in messages:
            if m is not None and os.path.exists(m.staged):
                os.unlink(m.staged)


class JsonlStreamWriter(DataSourceStreamWriter):
    def __init__(self, path: str):
        self.path = path
        os.makedirs(path, exist_ok=True)
        self._log = os.path.join(path, "_batches.json")

    def _committed(self) -> list:
        import json as _json

        if not os.path.exists(self._log):
            return []
        with open(self._log) as f:
            return _json.load(f)

    def write(self, iterator):  # executor-side, one micro-batch partition
        import json as _json
        import uuid as _uuid

        staged = os.path.join(self.path, f".staging-{_uuid.uuid4().hex}.jsonl")
        n = 0
        with open(staged, "w") as f:
            for row in iterator:
                f.write(_json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return _SinkCommit(staged, n)

    def commit(self, messages, batchId: int):
        import json as _json
        import uuid as _uuid

        done = self._committed()
        if batchId in done:  # replayed micro-batch: idempotent discard
            for m in messages:
                if m is not None and os.path.exists(m.staged):
                    os.unlink(m.staged)
            return
        for i, m in enumerate(messages):
            os.replace(
                m.staged,
                os.path.join(self.path, f"part-b{batchId:05d}-{i:05d}.jsonl"),
            )
        tmp = f"{self._log}.{_uuid.uuid4().hex[:8]}.tmp"
        with open(tmp, "w") as f:
            _json.dump([*done, batchId], f)
        os.replace(tmp, self._log)

    def abort(self, messages, batchId: int):
        for m in messages:
            if m is not None and os.path.exists(m.staged):
                os.unlink(m.staged)
