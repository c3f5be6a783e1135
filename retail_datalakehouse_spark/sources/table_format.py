"""Versioned-table format: Delta/Iceberg-style snapshot semantics on plain
parquet (SURVEY §2.1 S6/S7; BASELINE.json "table format operations").

Delta/Iceberg are not on this classpath, so the engine ships a minimal
log-structured table format with the same *operational* surface:

- every write is a new immutable **snapshot** (parquet under a per-commit
  directory) committed by atomically linking a manifest entry;
- readers resolve the manifest → **snapshot isolation** (a reader never
  sees a half-written version) and **time travel** (``read_version(n)``);
- ``append`` / ``overwrite`` / ``merge`` (upsert on keys) are the three
  commit types, mirroring Delta's write modes + MERGE INTO;
- the manifest records per-version lineage (parent, operation, row count)
  — the audit trail a lakehouse needs for reproducible training-data
  snapshots.

**Optimistic concurrency** (Delta's log-CAS, minus the JVM): each writer
stages its snapshot in a private directory ``_v<N>-<token>`` and then
tries to commit manifest ``_manifest/v<N>.json`` via ``os.link`` of a
fully-written temp file — link fails atomically if version N is already
committed (POSIX; object stores use put-if-absent). The loser gets
:class:`CommitConflict`, and the write paths **retry with rebase**:
re-read the now-current snapshot, re-derive the result, try N+1. Staged
data of a lost race is removed; readers only ever resolve directories
through committed manifests, so a crash mid-write leaves garbage, never
corruption.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from collections.abc import Callable
from urllib.parse import quote as _dl_quote

from pyspark.sql import DataFrame, SparkSession

from ..operators.merge import merge_upsert, merge_upsert_latest


class CommitConflict(RuntimeError):
    """Another writer committed the version this writer raced for."""


class ConcurrentMergeConflict(CommitConflict):
    """Serializable-isolation MERGE abort: between this writer's read
    snapshot and its commit attempt, another writer committed a change
    whose modified-key set overlaps (or is unknown) — rebasing would
    silently re-derive over a conflicting write, so the merge fails
    instead (Delta's ConcurrentModificationException contract)."""


def _parquet_num_rows(data_dir: str) -> int:
    """Row count from parquet footers (driver-side metadata read — no
    Spark job). Exactly what Delta stores in its commit stats: the
    footers are written with the data, so this is free relative to a
    re-scan."""
    import pyarrow.parquet as pq

    return sum(
        pq.read_metadata(os.path.join(root, f)).num_rows
        for root, _dirs, files in os.walk(data_dir)
        for f in files
        if f.endswith(".parquet")
    )


# Delta's dataSkippingNumIndexedCols default; stats beyond it buy little
_STATS_MAX_COLS = 32
# one JSON manifest per version: past this file count, per-file stats are
# omitted (real Iceberg shards manifests + a manifest list; this format's
# commits produce task-count files, far below the cap)
_STATS_MAX_FILES = 1_000_000
# File lists above this size split into CHUNKED manifests (Iceberg's
# manifest-list design): the per-version JSON holds only chunk
# descriptors (path + per-chunk column bounds), and planning loads only
# the chunks a predicate's bounds touch. Below it, stats stay inline —
# one read, no indirection.
_MANIFEST_CHUNK_FILES = 1_000


def _stats_norm(v):
    """Footer min/max → JSON-storable, order-preserving scalar. ISO-8601
    strings compare lexicographically in timestamp order, so pruning
    comparisons stay correct after the round-trip."""
    import datetime

    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (int, float, str, bool)):
        return v
    return None  # bytes/decimal/nested: no stats (conservatively kept)


def _collect_manifest_stats(data_dir: str) -> tuple[int, list[dict] | None]:
    """(total rows, per-file stats) from parquet FOOTERS — one driver-side
    metadata pass, no Spark job, no data pages (the same numbers Delta
    writes as per-file `stats` in its log, Iceberg in its manifests).
    Each entry: {"path": rel_path, "n_rows": n, "stats": {col: [min, max]}}
    with None bounds where the footer has no usable statistics."""
    import pyarrow.parquet as pq

    total = 0
    files: list[dict] | None = []
    for root, _dirs, names in os.walk(data_dir):
        for f in sorted(names):
            if not f.endswith(".parquet"):
                continue
            md = pq.read_metadata(os.path.join(root, f))
            total += md.num_rows
            if md.num_rows == 0:
                # a zero-row file (range-clustering an empty bucket, an
                # all-filtered partition) adds nothing to any scan; listing
                # it would poison stats_agg/pruning with [None, None] stats
                continue
            if files is None or len(files) >= _STATS_MAX_FILES:
                files = None
                continue
            cols = md.schema.names[:_STATS_MAX_COLS]
            stats: dict = {}
            for ci, c in enumerate(md.schema.names):
                if c not in cols:
                    continue
                lo = hi = None
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(ci).statistics
                    if st is None or not st.has_min_max:
                        lo = hi = None
                        break
                    mn, mx = _stats_norm(st.min), _stats_norm(st.max)
                    if mn is None or mx is None:
                        lo = hi = None
                        break
                    lo = mn if lo is None else min(lo, mn)
                    hi = mx if hi is None else max(hi, mx)
                stats[c] = [lo, hi]
            files.append(
                {
                    "path": os.path.relpath(os.path.join(root, f), data_dir),
                    "n_rows": md.num_rows,
                    "stats": stats,
                }
            )
    return total, files


def _chunk_bounds(files: list[dict]) -> dict:
    """Chunk-level column bounds = the fold of member files' [min, max].
    A column appears ONLY when every member file has usable bounds for it
    — an absent column means "cannot prune this chunk by this column"
    (conservatively loaded), never a wrong bound."""
    cols: dict | None = None
    for f in files:
        if cols is None:
            cols = {
                c: list(b)
                for c, b in f["stats"].items()
                if b[0] is not None and b[1] is not None
            }
            continue
        for c in list(cols):
            b = f["stats"].get(c, [None, None])
            if b[0] is None or b[1] is None:
                del cols[c]
            else:
                lo, hi = cols[c]
                cols[c] = [min(lo, b[0]), max(hi, b[1])]
    return cols or {}


def _hidden_partition_col(spec: dict):
    """The engine-derived partition expression for a hidden-partition
    spec (Iceberg transform semantics, monotonic integer domains so
    source-predicate ranges map to partition-value ranges):

    - ``year``:  calendar year of the source date/timestamp
    - ``month``: months since epoch (year*12 + month-1)
    - ``day``:   days since epoch
    - ``bucket:N``: xxhash64(source) mod N (equality/IN pruning only)
    """
    from pyspark.sql import functions as F

    t, src = spec["transform"], spec["source"]
    c = F.col(src)
    if t == "year":
        return F.year(c).cast("long")
    if t == "month":
        return (F.year(c) * 12 + F.month(c) - 1).cast("long")
    if t == "day":
        return F.datediff(c.cast("date"), F.lit("1970-01-01")).cast("long")
    if t.startswith("bucket:"):
        return F.pmod(F.xxhash64(c), int(t.split(":")[1])).cast("long")
    raise ValueError(f"unknown hidden-partition transform: {t!r}")


def _hidden_partition_literal(t: str, value) -> int:
    """Python-side twin of :func:`_hidden_partition_col` for date-family
    transforms — maps a source-column literal into the partition-value
    domain so scan planning can derive partition bounds WITHOUT a Spark
    job. ``value``: datetime.date/datetime or ISO string."""
    import datetime as _dt

    if isinstance(value, str):
        value = _dt.date.fromisoformat(value[:10])
    elif isinstance(value, _dt.datetime):
        value = value.date()
    if t == "year":
        return value.year
    if t == "month":
        return value.year * 12 + value.month - 1
    if t == "day":
        return (value - _dt.date(1970, 1, 1)).days
    raise ValueError(f"transform {t!r} has no literal range mapping")


def _with_contiguous_ids(
    df: DataFrame, col: str, start: int
) -> tuple[DataFrame, int]:
    """Assign dense, contiguous int64 ids ``start..start+n-1`` WITHOUT a
    global sort: one count-per-partition pass computes each partition's
    offset (a tiny dict broadcast in the task closure), then an Arrow
    ``mapInPandas`` stamps ranges per partition — narrow, no shuffle, no
    single-partition window, O(#partitions) driver state. The same
    two-phase plan ``zipWithIndex`` uses, kept in the DataFrame/Arrow
    lane. The input must be deterministic across the two passes — the
    identity append path persists it first."""
    from pyspark import TaskContext
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    cached = df.persist()
    sizes = {
        r["pid"]: r["n"]
        for r in cached.groupBy(F.spark_partition_id().alias("pid"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    offsets, acc = {}, start
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]
    schema = T.StructType(
        [*cached.schema.fields, T.StructField(col, T.LongType(), False)]
    )

    def gen(batches):
        import numpy as np

        nxt = offsets.get(TaskContext.get().partitionId(), 0)
        for pdf in batches:
            pdf[col] = np.arange(nxt, nxt + len(pdf), dtype="int64")
            nxt += len(pdf)
            yield pdf

    return cached.mapInPandas(gen, schema), acc - start


# Spark -> Iceberg primitive type names (Iceberg spec §Schemas). Spark's
# TimestampType is session-tz-adjusted => Iceberg timestamptz; TimestampNTZ
# => timestamp. Only flat schemas export (guarded below) — nested types
# would need element/key/value field ids this minimal exporter doesn't mint.
_ICEBERG_TYPES = {
    "boolean": "boolean",
    "integer": "int",
    "long": "long",
    "float": "float",
    "double": "double",
    "date": "date",
    "timestamp": "timestamptz",
    "timestamp_ntz": "timestamp",
    "string": "string",
    "binary": "binary",
}


def _hive_partition_values(rel: str, part_cols: list[str]) -> dict:
    """Recover a file's identity partition values from its hive
    ``col=value`` path segments — the shared metadata-borne-values
    source for BOTH open-table exporters (Delta partitionValues,
    Iceberg data_file.partition). Values stay the path's STRING
    rendering (readers cast under the table schema);
    ``__HIVE_DEFAULT_PARTITION__`` maps to None."""
    if not part_cols:
        return {}
    from urllib.parse import unquote

    seg_vals = dict(seg.split("=", 1) for seg in rel.split("/") if "=" in seg)
    out: dict = {}
    for c in part_cols:
        if c not in seg_vals:
            raise ValueError(
                f"partitioned export: file {rel!r} lacks a {c}= path segment"
            )
        raw = unquote(seg_vals[c])
        out[c] = None if raw == "__HIVE_DEFAULT_PARTITION__" else raw
    return out


def _iceberg_schema(
    schema, known_ids: dict[str, int] | None = None
) -> tuple[dict, dict[str, int]]:
    """Spark StructType -> (Iceberg schema JSON, {column: field-id}).
    Field ids are Iceberg's column-identity mechanism (names are just
    labels; ids survive renames and schema evolution), which is why the
    data-file bounds key on ids, not names. First export mints ids
    sequentially from 1; ``known_ids`` (the persisted name->id map of a
    prior export) pins every previously-seen column to its original id —
    new columns get FRESH ids past the historical maximum, and ids are
    NEVER reused, even for dropped columns (the returned map keeps
    dropped columns' entries so their ids stay retired forever)."""
    fields = []
    ids: dict[str, int] = dict(known_ids or {})
    next_id = max(ids.values(), default=0) + 1
    for f in schema.fields:
        tn = f.dataType.typeName()
        if tn == "decimal":
            ice = f"decimal({f.dataType.precision}, {f.dataType.scale})"
        elif tn in _ICEBERG_TYPES:
            ice = _ICEBERG_TYPES[tn]
        else:
            raise ValueError(
                f"iceberg export supports flat primitive schemas; column "
                f"{f.name!r} has type {tn}"
            )
        if f.name not in ids:
            ids[f.name] = next_id
            next_id += 1
        fields.append(
            {
                "id": ids[f.name],
                "name": f.name,
                "required": not f.nullable,
                "type": ice,
            }
        )
    return {"type": "struct", "schema-id": 0, "fields": fields}, ids


class VersionedTable:
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        record_cdf: bool = False,
        cdf_keys: list[str] | None = None,
        manifest_chunk_files: int | None = None,
    ):
        """``record_cdf=True`` makes append / plain merge / delete commits
        WRITE their row-level deltas alongside the snapshot (Delta's
        delta.enableChangeDataFeed): :meth:`changes_feed` then serves any
        version range in O(|changes|) by composing the recorded deltas —
        never diffing snapshots. ``cdf_keys`` (required with record_cdf)
        is the row identity the feed classifies on.

        ``manifest_chunk_files`` overrides the chunked-manifest threshold
        (_MANIFEST_CHUNK_FILES) for THIS handle's commits — tables
        expecting huge file counts can chunk earlier; tests and demo
        queries can chunk tiny tables. Reads auto-detect either layout,
        so handles with different settings interoperate."""
        self.spark = spark
        self.path = path
        self._chunk_files = (
            _MANIFEST_CHUNK_FILES
            if manifest_chunk_files is None
            else int(manifest_chunk_files)
        )
        self._manifest_dir = os.path.join(path, "_manifest")
        if record_cdf and not cdf_keys:
            raise ValueError("record_cdf=True requires cdf_keys")
        self._record_cdf = record_cdf
        self._cdf_keys = list(cdf_keys or [])
        self._ref_name: str | None = None  # set on branch handles

    # ----------------------------------------------------------- manifest

    def _versions(self) -> list[int]:
        if not os.path.isdir(self._manifest_dir):
            return []
        out = []
        for f in os.listdir(self._manifest_dir):
            if f.startswith("v") and f.endswith(".json"):
                out.append(int(f[1:-5]))
        out.sort()
        # Multi-table txn visibility: a manifest staged by an in-flight
        # transaction claims its version slot but is INVISIBLE until the
        # txn's one commit marker exists. Invariant: only the TAIL version
        # can be unresolved (writers can't stack on an invisible version),
        # so one metadata read resolves the whole listing. A committed
        # pending entry is lazily rolled forward (finalized) by whichever
        # reader sees it first — crash-safe publication.
        while out:
            m = self._manifest(out[-1])
            marker = m.get("pending_txn_marker")
            if marker is None:
                break
            if os.path.exists(marker + ".committed.json"):
                self._finalize_pending(out[-1])
                break
            out.pop()  # in-flight or aborted: not a table version (yet)
        return out

    def _finalize_pending(self, version: int) -> None:
        """Strip the pending flag from a txn-committed manifest (atomic
        in-place replace; racing finalizers write identical content)."""
        p = os.path.join(self._manifest_dir, f"v{version}.json")
        m = json.load(open(p))
        if "pending_txn_marker" not in m:
            return
        m.pop("pending_txn_marker")
        tmp = f"{p}.{uuid.uuid4().hex[:8]}.fin.tmp"
        with open(tmp, "w") as f:
            json.dump(m, f)
        os.replace(tmp, p)

    def current_version(self) -> int | None:
        """Head resolution. With a log CHECKPOINT (Delta's
        ``_last_checkpoint`` idea): start at the checkpointed version and
        PROBE FORWARD with O(commits-since-checkpoint) existence checks —
        never listing the manifest dir, which at 10^6 commits costs a
        full directory scan per read (measured in
        tools/bench_log_checkpoint.py). Falls back to the listing when no
        checkpoint exists, the checkpointed manifest expired (vacuum
        retain_last), or the probe lands entirely on in-flight txn
        claims."""
        cp = self._read_log_checkpoint()
        if cp is not None and os.path.exists(
            os.path.join(self._manifest_dir, f"v{cp}.json")
        ):
            w = cp
            while os.path.exists(
                os.path.join(self._manifest_dir, f"v{w + 1}.json")
            ):
                w += 1
            # tail txn-visibility (the _versions invariant: only the tail
            # can be unresolved): walk back over invisible claims
            while w >= cp:
                m = self._manifest(w)
                marker = m.get("pending_txn_marker")
                if marker is None:
                    return w
                if os.path.exists(marker + ".committed.json"):
                    self._finalize_pending(w)
                    return w
                w -= 1
        vs = self._versions()
        return vs[-1] if vs else None

    def _log_checkpoint_path(self) -> str:
        # MUST NOT match _versions()'s `v*.json` glob
        return os.path.join(self._manifest_dir, "_last_checkpoint.json")

    def _read_log_checkpoint(self) -> int | None:
        try:
            return int(json.load(open(self._log_checkpoint_path()))["version"])
        except (FileNotFoundError, KeyError, ValueError):
            return None

    def checkpoint_log(self) -> int:
        """Record the current COMMITTED head as the log checkpoint
        (Delta ``_last_checkpoint``): later ``current_version`` calls
        probe forward from it instead of listing the manifest directory.
        Tmp+rename (idempotent, last-writer-wins — a stale checkpoint is
        only a longer probe, never wrong). Run it like VACUUM, from
        maintenance; :meth:`vacuum` refreshes it automatically."""
        vs = self._versions()
        if not vs:
            raise ValueError(f"cannot checkpoint empty table {self.path}")
        v = vs[-1]
        tmp = self._log_checkpoint_path() + f".{uuid.uuid4().hex[:8]}.tmp"
        with open(tmp, "w") as f:
            json.dump({"version": v, "written_at": time.time()}, f)
        os.replace(tmp, self._log_checkpoint_path())
        return v

    def _manifest(self, version: int) -> dict:
        return json.load(open(os.path.join(self._manifest_dir, f"v{version}.json")))

    # ------------------------------------------- chunked file-stats plane
    #
    # Iceberg's manifest-list design, reduced to this format: a version's
    # per-file stats live INLINE in its JSON up to _MANIFEST_CHUNK_FILES
    # entries; above that they split into chunk files
    # (``files-v{N}.{token}.{i}.json``) and the version JSON carries only
    # ``manifest_list`` — per-chunk descriptors with folded column bounds.
    # Planning prunes at CHUNK level first (driver reads O(chunks), not
    # O(files)); at ~10^6 files a monolithic per-version JSON costs
    # hundreds of MB of driver parse per plan, which is exactly why
    # Iceberg has a manifest list.

    def _attach_file_stats(
        self,
        entry: dict,
        file_stats: list[dict] | None,
        v: int,
        token: str,
        manifest_dir: str | None = None,
    ) -> list[str]:
        """Record ``file_stats`` on ``entry`` — inline when small, as
        chunk files + a ``manifest_list`` when large. Returns the chunk
        paths written (for cleanup on a lost commit race). Chunk names
        never match the ``v*.json`` manifest glob."""
        mdir = manifest_dir or self._manifest_dir
        csize = self._chunk_files
        if file_stats is None or len(file_stats) <= csize:
            entry["files"] = file_stats
            return []
        chunks, written = [], []
        for i in range(0, len(file_stats), csize):
            part = file_stats[i : i + csize]
            name = f"files-v{v}.{token}.{i // csize:05d}.json"
            p = os.path.join(mdir, name)
            tmp = p + ".tmp"
            with open(tmp, "w") as f:
                json.dump({"files": part}, f)
            os.replace(tmp, p)
            written.append(p)
            chunks.append(
                {
                    "path": name,
                    "n_files": len(part),
                    "n_rows": sum(f["n_rows"] for f in part),
                    "stats": _chunk_bounds(part),
                }
            )
        entry["files"] = None
        entry["manifest_list"] = chunks
        return written

    def _load_chunk(self, name: str) -> list[dict]:
        return json.load(open(os.path.join(self._manifest_dir, name)))["files"]

    def _file_stats_list(self, entry: dict) -> list[dict] | None:
        """The version's FULL per-file stats list, resolving chunking —
        O(files); use only where the whole list is genuinely needed
        (bloom builds, carry-forward into a child commit, clones).
        Planning paths go through :meth:`_planned_files` instead."""
        ml = entry.get("manifest_list")
        if ml is None:
            return entry.get("files")
        out: list[dict] = []
        for c in ml:
            out.extend(self._load_chunk(c["path"]))
        return out

    @staticmethod
    def _is_mor(entry: dict) -> bool:
        """True when the version has PENDING deletion tombstones of either
        flavor (key-based ``dv_dirs`` or position-based ``pos_dv_dirs``):
        its raw file list / file stats describe rows that are logically
        deleted, so every stats-planned path must fall back to the
        anti-join reader until compaction materializes."""
        return bool(entry.get("dv_dirs") or entry.get("pos_dv_dirs"))

    def _n_files(self, entry: dict) -> int | None:
        ml = entry.get("manifest_list")
        if ml is not None:
            return sum(c["n_files"] for c in ml)
        files = entry.get("files")
        return None if files is None else len(files)

    def _planned_files(
        self, entry: dict, phys: str, file_keep, chunk_overlaps
    ) -> tuple[list[dict], int]:
        """Scan planning over inline OR chunked stats: returns
        (surviving file dicts, n_files_total). ``file_keep(f)`` decides a
        file; ``chunk_overlaps(lo, hi)`` decides whether a chunk's folded
        bounds can contain matches — a chunk that can't is skipped with
        ZERO I/O (its files are never parsed), so plan cost is
        O(chunks + files_in_overlapping_chunks), not O(files)."""
        ml = entry.get("manifest_list")
        if ml is None:
            files = entry.get("files") or []
            return [f for f in files if file_keep(f)], len(files)
        n_total = sum(c["n_files"] for c in ml)
        kept: list[dict] = []
        for c in ml:
            b = c.get("stats", {}).get(phys)
            if b is not None and not chunk_overlaps(b[0], b[1]):
                continue
            kept.extend(f for f in self._load_chunk(c["path"]) if file_keep(f))
        return kept, n_total

    def history(self) -> list[dict]:
        return [self._manifest(v) for v in self._versions()]

    def _txn_state(self, version: int | None) -> dict:
        """Per-writer transaction watermarks as of ``version`` (Delta's
        ``txn`` action): {writer_id: last committed batch id}."""
        if not version:
            return {}
        return self._manifest(version).get("txn", {})

    def last_txn_batch(self, writer_id: str) -> int | None:
        got = self._txn_state(self.current_version()).get(writer_id)
        return None if got is None else int(got)

    def _try_commit(
        self,
        df: DataFrame,
        op: str,
        parent: int | None,
        txn: dict | None = None,
        modified_keys: list[int] | None = None,
        partition_by: list[str] | None = None,
        cdf_df: DataFrame | None = None,
        pending_txn_marker: str | None = None,
        cluster_by: list[str] | None = None,
        base: tuple[list[str], list[dict] | None, int] | None = None,
        identity_update: dict | None = None,
        hidden_partition: dict | None = None,
        file_granular: bool = False,
        generated_update: dict | None = None,
        defaults_update: dict | None = None,
    ) -> int:
        """Stage the snapshot in a private dir, then CAS the manifest for
        version parent+1. Raises :class:`CommitConflict` (after cleaning
        up the staged data) if another writer committed that version.

        ``pending_txn_marker`` (multi-table transactions): the manifest is
        linked as a PENDING claim — it owns the version slot but stays
        invisible to readers until ``<marker>.committed.json`` exists
        (see :class:`LakehouseTransaction`).

        ``modified_keys`` — fingerprints (xxhash64 of the key tuple) of
        the rows this commit touched; recorded in the manifest so later
        serializable writers can detect overlap. None = unknown write set
        (conservatively conflicts with every serializable merge); [] =
        touches no existing keys (blind append — never conflicts).

        ``base`` — incremental (AddFile-only) commit support:
        ``(base_dirs, base_files, base_n_rows)`` of the PARENT snapshot.
        Only ``df`` (the new rows) is written; the manifest's
        ``base_dirs`` carries the parent's data directories forward, its
        ``files`` stats merge the parent's (dir-qualified) entries with
        the new directory's footer walk, and ``n_rows`` composes — so
        the commit costs O(new data), the Delta/Iceberg append contract.
        ``base_files`` entries must already carry their ``dir``."""
        v = (parent or 0) + 1
        # GENERATED columns (Delta GENERATED ALWAYS AS): a batch lacking a
        # generated column gets it COMPUTED; a batch carrying one must
        # MATCH the expression (null-safe) — enforced below with the same
        # constraints plumbing as CHECKs, so an explicit wrong value
        # aborts the commit before it publishes.
        # DEFAULT column values (Delta ADD COLUMN ... DEFAULT): a batch
        # lacking a defaulted column takes the default AT WRITE TIME (an
        # explicit NULL stays NULL — only absence fills), so the stored
        # rows are always complete and the read path needs no per-file
        # schema bookkeeping.
        defaults = defaults_update if defaults_update is not None else (
            (self._manifest(parent).get("defaults") if parent else None) or {}
        )
        if defaults:
            from pyspark.sql import functions as F

            for _c, _e in defaults.items():
                if _c not in df.columns:
                    df = df.withColumn(_c, F.expr(_e))
        generated = generated_update if generated_update is not None else (
            (self._manifest(parent).get("generated") if parent else None) or {}
        )
        if generated:
            from pyspark.sql import functions as F

            for c, e in generated.items():
                if c not in df.columns:
                    df = df.withColumn(c, F.expr(e))
        # Persistent CHECK constraints (Delta ADD CONSTRAINT): recorded in
        # the manifest, enforced on the data each commit WRITES — O(new
        # rows) for incremental appends, piggybacking on the already-
        # O(table) scan for materializing commits. delete/compact are
        # row-preserving (they re-write rows that already passed under
        # the CURRENT constraint set) and skip it; restore is NOT — the
        # restored snapshot may predate the constraint, so it must pass
        # validation before republishing under the carried-forward
        # manifest metadata.
        checks = self._manifest(parent).get("checks") if parent else None
        if (checks or generated) and op not in ("delete", "compact"):
            from .constraints import enforce

            enforce(
                df,
                {
                    **(checks or {}),
                    **{
                        f"__gen_{c}": f"{c} <=> ({e})"
                        for c, e in generated.items()
                    },
                },
            )
        # UNIQUE/PK is a SNAPSHOT property, not row-local: validate the
        # candidate snapshot's key sets before publishing. Row-preserving
        # ops can't introduce duplicates. Cost is one key-columns-only
        # shuffle per declared key — the price warehouses pay with an
        # index and Delta/Iceberg simply don't pay (they don't enforce).
        # (restore included: a snapshot that predates add_unique — or
        # predates the dedup that made the constraint addable — would
        # otherwise republish duplicate keys while carrying the uniques
        # metadata forward, breaking the "any commit that would publish
        # duplicates aborts" contract.)
        uniques = self._manifest(parent).get("uniques") if parent else None
        if uniques and op not in ("delete", "compact"):
            from .constraints import enforce_unique

            # For materializing commits ``df`` IS the candidate snapshot;
            # for incremental (AddFile-only) commits ``df`` is just the
            # new rows, so the candidate is parent-snapshot UNION df —
            # still one key-columns-only shuffle (keys project before
            # the groupBy prunes everything else at the scan).
            candidate = df
            if base is not None and parent is not None:
                candidate = self.read_version(parent).select(*df.columns).unionByName(df)
            enforce_unique(candidate, uniques)
        token = uuid.uuid4().hex[:8]
        data_dirname = f"_v{v}-{token}"
        data_dir = os.path.join(self.path, data_dirname)
        if partition_by:
            from pyspark.sql import functions as F

            # Optimize-write (Delta's optimizeWrite analogue): cluster rows
            # by the partition values first, so each hive directory is
            # written by one task — one right-sized file per directory
            # instead of (tasks × directories) small files. A heavily
            # skewed partition would serialize on its one task; at real
            # scale pair this with AQE rebalance or add a bucketing column
            # to the repartition key.
            df = df.repartition(*[F.col(c) for c in partition_by])
        # Spark's default parquet timestamp encoding is INT96, which
        # carries NO column statistics — micros is the modern annotated
        # type (what Delta/Iceberg require) and gives the footer min/max
        # the manifest stats and read_pruned depend on.
        df.sparkSession.conf.set(
            "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
        )
        writer = df.write.mode("overwrite")
        if partition_by:
            # Iceberg-style partition EVOLUTION: the layout is per-snapshot
            # manifest metadata, not table schema — each version may carry
            # its own partitioning, and readers prune by whatever layout
            # the snapshot they read was written with.
            writer = writer.partitionBy(*partition_by)
        writer.parquet(data_dir)  # private staging dir …
        cdf_dirname = None
        if cdf_df is not None:
            # Write-time change feed: the delta rows stage next to the
            # snapshot and commit (or vanish) atomically with it.
            cdf_dirname = f"_cdf-v{v}-{token}"
            cdf_df.write.mode("overwrite").parquet(
                os.path.join(self.path, cdf_dirname)
            )
        os.makedirs(self._manifest_dir, exist_ok=True)
        # same footer walk that row counts always cost, now also recording
        # per-file min/max in the manifest → scan PLANNING can prune files
        # with zero listing and zero footer reads (Iceberg-style)
        n_rows, file_stats = _collect_manifest_stats(data_dir)
        base_dirs = None
        if base is not None:
            b_dirs, b_files, b_n = base
            base_dirs = b_dirs
            n_rows += b_n
            if file_stats is not None and b_files is not None:
                file_stats = [
                    *b_files,
                    *({**f, "dir": data_dirname} for f in file_stats),
                ]
                if len(file_stats) > _STATS_MAX_FILES:
                    file_stats = None
            else:
                file_stats = None
        entry = {
            "version": v,
            "operation": op,
            "parent": parent,
            "n_rows": n_rows,
            "data_dir": data_dirname,
            "partition_by": partition_by,
            "cdf_dir": cdf_dirname,
            "committed_at": time.time(),
            "modified_keys": modified_keys,
            # transaction watermarks carry forward: {writer_id: last batch}
            "txn": dict(self._txn_state(parent), **(txn or {})),
            # declared layout metadata (Iceberg sort-order analogue):
            # which columns this snapshot is range-clustered on
            "cluster_by": cluster_by,
        }
        # inline for small commits; chunked manifests + manifest_list for
        # large ones (written BEFORE the CAS link, removed on a lost race)
        chunk_paths = self._attach_file_stats(entry, file_stats, v, token)
        if base_dirs is not None:
            # incremental commit: parent data directories carried forward
            entry["base_dirs"] = base_dirs
        if hidden_partition is not None:
            # layout metadata, per-snapshot like partition_by: which
            # engine-derived transform the hive layout encodes
            entry["hidden_partition"] = hidden_partition
        if checks:
            entry["checks"] = checks
        if uniques:
            entry["uniques"] = uniques
        if generated:
            entry["generated"] = generated
        if defaults:
            entry["defaults"] = defaults
        # identity high watermarks: updated by identity appends, carried
        # verbatim by every other commit (deletes never free ids)
        identity = identity_update or (
            self._manifest(parent).get("identity") if parent else None
        )
        if identity:
            entry["identity"] = identity
        if pending_txn_marker is not None:
            entry["pending_txn_marker"] = pending_txn_marker
        if file_granular:
            # an AddFile append chained onto an optimize snapshot: readers
            # must keep resolving the EXPLICIT file list (the carried dirs
            # also hold superseded originals). Requires the composed list
            # to have survived (the append path pre-checks p_files; the
            # 10^6-file stats guard is the only way to lose it here).
            if file_stats is None:
                shutil.rmtree(data_dir, ignore_errors=True)
                raise ValueError(
                    "file-granular commit requires a complete file list; "
                    "compact below the stats cap first"
                )
            entry["file_granular"] = True
        tmp = os.path.join(self._manifest_dir, f".v{v}.{token}.json.tmp")
        with open(tmp, "w") as f:
            json.dump(entry, f)
        final = os.path.join(self._manifest_dir, f"v{v}.json")

        def _lose_slot():
            # clean the staged dirs, surface the conflict to the caller's
            # rebase loop — staged data must never leak on a lost race
            shutil.rmtree(data_dir, ignore_errors=True)
            if cdf_dirname:
                shutil.rmtree(
                    os.path.join(self.path, cdf_dirname), ignore_errors=True
                )
            for cp in chunk_paths:
                try:
                    os.unlink(cp)
                except FileNotFoundError:
                    pass
            raise CommitConflict(
                f"version {v} already committed at {self.path}"
            ) from None

        try:
            # CAS commit: fails iff v is held by a committed version or a
            # live txn claim (a stale ABORTED claim is cleared + retried
            # inside the helper — shared with every other DML verb).
            if not self._link_version_slot(tmp, final, v):
                _lose_slot()
        finally:
            os.unlink(tmp)
        return v

    def _link_version_slot(self, tmp: str, final: str, v: int) -> bool:
        """CAS-link ``tmp`` into version slot ``final``. True = we own the
        slot. False = a REAL holder (committed version or in-flight txn
        claim) — the caller rebases onto the winner's snapshot.

        A stale claim from an ABORTED transaction is not a real holder:
        it is cleared (with :meth:`_clear_aborted_claim`'s dual-marker
        refusal) and the link retried once, mirroring ``_commit``.
        Without this, a crashed transaction whose claim holds ``v`` makes
        ``_versions()`` exclude it, so every rebase retry recomputes the
        SAME ``v``, the link fails ``max_retries`` times, and the verb
        raises CommitConflict forever until some plain append clears the
        claim (the r9 ADVICE medium finding — the DML verbs built that
        round lacked ``_commit``'s clearing step)."""
        try:
            os.link(tmp, final)
            return True
        except FileExistsError:
            if not self._clear_aborted_claim(v):
                return False
            try:
                os.link(tmp, final)
                return True
            except FileExistsError:
                # another writer re-took the freed slot between the clear
                # and our retry — a genuine lost race
                return False

    def _clear_aborted_claim(self, v: int) -> bool:
        """True iff version ``v``'s manifest was a pending claim from an
        ABORTED transaction and was removed (slot free again). The txn's
        staged data dir is cleaned best-effort — abandoned data is
        garbage, never corruption (readers resolve only via manifests)."""
        p = os.path.join(self._manifest_dir, f"v{v}.json")
        try:
            m = json.load(open(p))
        except FileNotFoundError:
            return True  # claim vanished (racing cleaner) — slot free
        marker = m.get("pending_txn_marker")
        if marker is None or not os.path.exists(marker + ".aborted.json"):
            return False
        if os.path.exists(marker + ".committed.json"):
            # Dual-marker state (a commit raced the presume-abort): the
            # committed marker wins for readers (_versions), so the claim
            # is NOT clearable — removing its manifest/data would destroy
            # a version already served as committed.
            return False
        shutil.rmtree(os.path.join(self.path, m["data_dir"]), ignore_errors=True)
        for c in m.get("manifest_list") or []:
            try:
                os.unlink(os.path.join(self._manifest_dir, c["path"]))
            except FileNotFoundError:
                pass
        try:
            os.unlink(p)
        except FileNotFoundError:
            pass
        return True

    def _check_serializable(
        self, read_version: int | None, modified_keys: list[int] | None
    ) -> None:
        """Raise :class:`ConcurrentMergeConflict` if any version committed
        AFTER ``read_version`` touched keys overlapping ``modified_keys``.

        Rules (Delta's conflict matrix, reduced to this format's ops):
        blind appends (recorded ``modified_keys == []``) never conflict;
        a commit with an unknown write set (None — overwrite, delete,
        fold, pre-feature manifests) always conflicts; two merges
        conflict iff their key-fingerprint sets intersect. Our own
        unknown write set (None — updates wider than the fingerprint cap)
        conflicts with everything but appends."""
        current = self.current_version()
        for v in range((read_version or 0) + 1, (current or 0) + 1):
            m = self._manifest(v)
            theirs = m.get("modified_keys")
            if theirs == []:
                continue  # blind append
            if theirs is None or modified_keys is None:
                raise ConcurrentMergeConflict(
                    f"serializable merge aborted: version {v} "
                    f"({m['operation']}) has an unknown write set"
                )
            if set(theirs) & set(modified_keys):
                raise ConcurrentMergeConflict(
                    f"serializable merge aborted: version {v} "
                    f"({m['operation']}) modified overlapping keys"
                )

    def _commit_with_retry(
        self,
        build: Callable[[DataFrame | None], DataFrame],
        op: str,
        max_retries: int = 5,
        txn: tuple[str, int] | None = None,
        modified_keys: list[int] | None = None,
        serializable: bool = False,
        partition_by: list[str] | None = None,
        cdf_build: Callable[[DataFrame | None], DataFrame] | None = None,
        cluster_by: list[str] | None = None,
        hidden_partition: dict | None = None,
        inherit_layout: bool = False,
        generated_update: dict | Callable[[dict], dict] | None = None,
        defaults_update: dict | Callable[[dict], dict] | None = None,
    ) -> int:
        """Optimistic-concurrency loop: derive the new snapshot from the
        CURRENT one, try the CAS commit, and on conflict rebase onto the
        winner's snapshot and retry.

        ``generated_update`` / ``defaults_update`` may be callables over
        the current parent's manifest entry — resolved per attempt, so a
        retry after a lost race rebuilds the metadata dict from the race
        winner's state instead of republishing a stale copy.

        ``txn=(writer_id, batch_id)`` makes the commit IDEMPOTENT per
        writer (Delta's txn action): a batch at or below the writer's
        recorded watermark is skipped — the exactly-once guard that lets
        a restarted ``foreachBatch`` stream replay its last micro-batch
        without double-applying it. The check re-runs after every lost
        race, so a replay racing a fresh writer still commits at most
        once.

        ``serializable=True`` (merges only): before rebasing onto a race
        winner, check the intervening commits' recorded write sets — if
        any overlaps this writer's ``modified_keys`` (or is unknown), the
        rebase would silently re-apply conflicting logic, so raise
        :class:`ConcurrentMergeConflict` to the caller instead. Disjoint
        writers still rebase-retry and all commit.

        ``inherit_layout=True`` (row-changing ops on an already-laid-out
        table — append fallback / delete / merge / fold): the new
        snapshot keeps the PARENT's partition layout and hidden-
        partition spec instead of silently rewriting a partitioned
        table unpartitioned. ``overwrite`` never inherits — declaring
        (or clearing) the layout is exactly what overwrite is for
        (partition evolution)."""
        for _ in range(max_retries):
            parent = self.current_version()
            if txn is not None:
                last = self._txn_state(parent).get(txn[0])
                if last is not None and int(last) >= txn[1]:
                    return parent  # already applied — idempotent no-op
            pb, spec = partition_by, hidden_partition
            if (
                inherit_layout
                and parent is not None
                and pb is None
                and spec is None
            ):
                # the hive/hidden layout is physically re-enforced by the
                # partitionBy write, so inheriting it is truthful;
                # cluster_by is NOT inherited — a rewrite does not
                # re-cluster, and declaring stale clustering would lie
                p_entry = self._manifest(parent)
                pb = p_entry.get("partition_by")
                spec = p_entry.get("hidden_partition")
            try:
                cur = self.read()
                new_df = build(cur)  # build first: its errors (e.g. delete
                # on an empty table) must surface before the delta derives
                if spec and spec["name"] not in new_df.columns:
                    # hidden layouts: reads drop the derived column, so a
                    # rebuilt snapshot re-derives it before the write
                    new_df = new_df.withColumn(
                        spec["name"], _hidden_partition_col(spec)
                    )
                cdf_df = (
                    cdf_build(cur)
                    if (cdf_build is not None and self._record_cdf)
                    else None
                )
                # Metadata updates may be CALLABLES over the current
                # parent's manifest — resolved per attempt so a rebase
                # onto a race winner rebuilds the dict from the WINNER's
                # state instead of republishing a stale pre-race copy
                # (which would silently drop the winner's metadata).
                _p_entry = self._manifest(parent) if parent is not None else {}
                gu = (
                    generated_update(_p_entry)
                    if callable(generated_update)
                    else generated_update
                )
                du = (
                    defaults_update(_p_entry)
                    if callable(defaults_update)
                    else defaults_update
                )
                return self._try_commit(
                    new_df, op, parent,
                    txn=None if txn is None else {txn[0]: txn[1]},
                    modified_keys=modified_keys,
                    partition_by=pb,
                    cdf_df=cdf_df,
                    cluster_by=cluster_by,
                    hidden_partition=spec,
                    generated_update=gu,
                    defaults_update=du,
                )
            except ConcurrentMergeConflict:
                raise
            except CommitConflict:
                if serializable:
                    self._check_serializable(parent, modified_keys)
                continue
        raise CommitConflict(
            f"lost {max_retries} consecutive commit races at {self.path}"
        )

    # ------------------------------------------------------------- writes

    def overwrite(
        self,
        df: DataFrame,
        partition_by: list[str] | None = None,
        cluster_by: list[str] | None = None,
        cluster_files: int = 16,
        hidden_partition: tuple[str, str] | None = None,
    ) -> int:
        """Replace the table with ``df``. ``partition_by`` evolves the
        snapshot's physical layout (hive-style directories) without
        touching the logical schema — the Iceberg partition-evolution
        semantics: old snapshots keep their old layout, time travel and
        CDF still work across layout changes, and readers prune by the
        layout of the snapshot they read.

        ``cluster_by`` (Delta liquid-clustering / Iceberg sort-order
        analogue): range-cluster the snapshot on the given columns into
        ``cluster_files`` files, so each file covers a narrow key slice
        and the manifest's per-file min/max actually PRUNE
        (:meth:`read_pruned` / :meth:`read_pruned_in`). Recorded in the
        manifest as declared layout metadata. Orthogonal to
        ``partition_by`` — clustering shapes files, partitioning shapes
        directories.

        ``hidden_partition=(transform, source_col)`` (Iceberg HIDDEN
        partitioning): the ENGINE derives the partition column from a
        declared transform — ``"year" | "month" | "day" | "bucket:N"``
        of a source column — writes the hive layout on it, records the
        spec in the manifest, and hides the column from every read.
        Queries keep filtering on the SOURCE column; scan planning
        (:meth:`read_hidden` / :meth:`read_hidden_in`) maps source
        predicates into partition-value bounds through the same
        transform, so users can never write the
        filters-on-the-wrong-column bug that un-prunes a naive
        date-string layout. Mutually exclusive with ``partition_by``."""
        spec = None
        if hidden_partition is not None:
            if partition_by:
                raise ValueError(
                    "hidden_partition and partition_by are mutually exclusive"
                )
            t, src = hidden_partition
            if src not in df.columns:
                raise ValueError(f"no such column: {src!r}")
            name = f"__p_{t.replace(':', '_')}_{src}"
            spec = {"name": name, "transform": t, "source": src}
            df = df.withColumn(name, _hidden_partition_col(spec))
            partition_by = [name]
        if cluster_by:
            from pyspark.sql import functions as F

            df = df.repartitionByRange(
                cluster_files, *[F.col(c) for c in cluster_by]
            )
        return self._commit_with_retry(
            lambda cur: df, "overwrite", partition_by=partition_by,
            cluster_by=cluster_by, hidden_partition=spec,
        )

    def overwrite_where(
        self,
        df: DataFrame,
        condition,
        partition_by: list[str] | None = None,
        txn: tuple[str, int] | None = None,
    ) -> int:
        """Delta's ``replaceWhere``: atomically replace ONLY the rows
        matching ``condition`` with ``df`` — the idempotent-backfill
        primitive (re-run a day's pipeline and swap exactly that day).
        Every row of ``df`` must satisfy ``condition`` (enforced with one
        driver-side existence check, as Delta does): otherwise a backfill
        could silently leak rows into slices it claimed not to touch.
        The untouched slice is carried over from the current snapshot, so
        concurrent serializable merges treat this as an unknown write set
        (conservative conflict), like overwrite."""
        from pyspark.sql import functions as F

        cond = F.expr(condition) if isinstance(condition, str) else condition
        # NULL-safe on BOTH sides of the predicate (Delta's replaceWhere
        # contract): a row where ``cond`` evaluates NULL did NOT match, so
        # it must be RETAINED in the table and REJECTED as a replacement
        # row. Plain ``~cond`` is NULL for such rows — filter drops them
        # from both slices, silently deleting them from the table and
        # letting them leak past the stray guard.
        not_matched = ~cond.eqNullSafe(F.lit(True))
        stray = df.filter(not_matched).limit(1).collect()
        if stray:
            raise ValueError(
                f"replaceWhere: replacement rows must all match {condition!r}; "
                f"found {stray[0]}"
            )

        def build(cur: DataFrame | None) -> DataFrame:
            if cur is None:
                return df
            return cur.filter(not_matched).unionByName(df)

        return self._commit_with_retry(
            build, "replace_where", txn=txn, partition_by=partition_by,
            inherit_layout=True,
        )

    def overwrite_range(
        self,
        col: str,
        lo,
        hi,
        df: DataFrame,
        rows_per_file: int = 1_000_000,
        max_retries: int = 5,
    ) -> dict:
        """INCREMENTAL ``replaceWhere`` (r11): atomically replace the rows
        with ``col BETWEEN lo AND hi`` by ``df``, rewriting ONLY the
        files whose per-file [min, max] overlaps the range — every
        disjoint file carries by reference. :meth:`overwrite_where` is
        the general-predicate form but materializes O(table); on a
        range-clustered table the backfill window touches a handful of
        files, and at 100 TB re-running one day's pipeline must cost
        that day, not the table (Delta's replaceWhere over a clustered
        layout makes the same promise). Planning is the manifest
        interval math :meth:`optimize_incremental` uses; the commit is
        file-granular (explicit file list), like optimize.

        Same contracts as overwrite_where: every replacement row must
        satisfy the range (NULL-safe — a NULL ``col`` neither matches
        nor may appear in ``df``); retained rows inside overlapping
        files are those where the predicate is not TRUE. Unpartitioned
        snapshots with per-file stats and no pending tombstones only.

        Returns ``{"version", "rewritten", "carried"}``."""
        from pyspark.sql import functions as F

        phys_check = df.filter(
            ~F.col(col).between(F.lit(lo), F.lit(hi)).eqNullSafe(F.lit(True))
        ).limit(1).collect()
        if phys_check:
            raise ValueError(
                f"overwrite_range: replacement rows must all have {col} in "
                f"[{lo!r}, {hi!r}]; found {phys_check[0]}"
            )
        for _ in range(max_retries):
            parent = self.current_version()
            if parent is None:
                raise ValueError(f"cannot replace into empty table {self.path}")
            p_entry = self._manifest(parent)
            if self._is_mor(p_entry):
                raise ValueError(
                    "overwrite_range over pending deletion tombstones is "
                    "ambiguous; compact first"
                )
            if p_entry.get("partition_by") or p_entry.get("hidden_partition"):
                raise ValueError(
                    "overwrite_range plans from per-file stats on "
                    "unpartitioned layouts; hive tables use overwrite_where"
                )
            if p_entry.get("column_renames") or p_entry.get("column_drops"):
                raise ValueError(
                    "overwrite_range under a column mapping would union "
                    "physical and logical schemas; materialize the mapping "
                    "(compact) first or use overwrite_where"
                )
            files = self._file_stats_list(p_entry)
            if not files:
                raise ValueError(
                    "overwrite_range needs per-file stats; this manifest "
                    "carries none (use overwrite_where)"
                )
            phys = self._physical_name(p_entry, col)
            p_dir = p_entry["data_dir"]
            files = [f if "dir" in f else {**f, "dir": p_dir} for f in files]
            nlo, nhi = _stats_norm(lo), _stats_norm(hi)

            def disjoint(f):
                fmin, fmax = f["stats"].get(phys, [None, None])
                return fmin is not None and (fmax < nlo or fmin > nhi)

            carried = [f for f in files if disjoint(f)]
            affected = [f for f in files if not disjoint(f)]
            n_affected_rows = sum(f["n_rows"] for f in affected)

            v = parent + 1
            token = uuid.uuid4().hex[:8]
            data_dirname = f"_v{v}-{token}"
            data_dir = os.path.join(self.path, data_dirname)
            self.spark.conf.set(
                "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
            )
            retained = None
            if affected:
                # retain the NOT-TRUE slice of overlapping files (NULL col
                # rows retained, per the replaceWhere contract)
                retained = self.spark.read.parquet(
                    *[os.path.join(self.path, f["dir"], f["path"]) for f in affected]
                ).filter(
                    ~F.col(phys).between(F.lit(lo), F.lit(hi)).eqNullSafe(F.lit(True))
                )
            out = df if retained is None else retained.unionByName(df)
            n_out_rows = out.count()
            n_files_out = max(1, -(-max(n_out_rows, 1) // rows_per_file))
            out.repartitionByRange(
                n_files_out, F.col(phys)
            ).write.mode("overwrite").parquet(data_dir)
            n_new_rows, new_files = _collect_manifest_stats(data_dir)
            if n_new_rows != n_out_rows:
                shutil.rmtree(data_dir, ignore_errors=True)
                raise RuntimeError(
                    f"overwrite_range row-preservation violated: planned "
                    f"{n_out_rows} rows, files hold {n_new_rows} at {self.path}"
                )
            all_files = [
                *carried,
                *({**f, "dir": data_dirname} for f in new_files or []),
            ]
            entry = {
                "version": v,
                "operation": "replace_range",
                "parent": parent,
                "n_rows": sum(f["n_rows"] for f in carried) + n_new_rows,
                "data_dir": data_dirname,
                "base_dirs": sorted({f["dir"] for f in carried}),
                "partition_by": None,
                "cluster_by": p_entry.get("cluster_by"),
                "cdf_dir": None,
                "file_granular": True,
                "committed_at": time.time(),
                # write set: the replaced range (serializable merges on
                # disjoint keys may commute; unknown-key writers conflict)
                "modified_keys": None,
                "txn": dict(self._txn_state(parent)),
                **(
                    {"column_renames": p_entry["column_renames"]}
                    if p_entry.get("column_renames")
                    else {}
                ),
                **(
                    {"column_drops": p_entry["column_drops"]}
                    if p_entry.get("column_drops")
                    else {}
                ),
                **({"checks": p_entry["checks"]} if p_entry.get("checks") else {}),
                **({"uniques": p_entry["uniques"]} if p_entry.get("uniques") else {}),
                **(
                    {"generated": p_entry["generated"]}
                    if p_entry.get("generated")
                    else {}
                ),
                **(
                    {"defaults": p_entry["defaults"]}
                    if p_entry.get("defaults")
                    else {}
                ),
                **(
                    {"identity": p_entry["identity"]}
                    if p_entry.get("identity")
                    else {}
                ),
            }
            chunk_paths = self._attach_file_stats(entry, all_files, v, token)
            os.makedirs(self._manifest_dir, exist_ok=True)
            tmp = os.path.join(self._manifest_dir, f".v{v}.{token}.json.tmp")
            with open(tmp, "w") as f:
                json.dump(entry, f)
            final = os.path.join(self._manifest_dir, f"v{v}.json")
            try:
                if self._link_version_slot(tmp, final, v):
                    return {
                        "version": v,
                        "rewritten": len(affected),
                        "carried": len(carried),
                        "replaced_rows": n_affected_rows,
                    }
                shutil.rmtree(data_dir, ignore_errors=True)
                for cp in chunk_paths:
                    try:
                        os.unlink(cp)
                    except FileNotFoundError:
                        pass
                continue
            finally:
                os.unlink(tmp)
        raise CommitConflict(
            f"lost {max_retries} consecutive commit races at {self.path}"
        )

    def append(
        self,
        df: DataFrame,
        txn: tuple[str, int] | None = None,
        merge_schema: bool = False,
        identity: str | None = None,
    ) -> int:
        """Append rows as a new snapshot. ``merge_schema=True`` is Delta's
        mergeSchema write option: a batch carrying NEW columns widens the
        table schema (existing rows read the new columns as null, and a
        batch missing existing columns nulls them) instead of failing —
        additive evolution only, never a drop or retype.

        INCREMENTAL by default (the Delta/Iceberg AddFile contract):
        when the batch schema matches the current snapshot's and the
        snapshot has no hive layout and no pending deletion vectors, the
        commit writes ONLY the new rows and the manifest carries the
        parent's data directories forward — O(new data), never O(table).
        An hourly append to a 100 TB table costs the hour, not the
        table. Otherwise (schema widening, partitioned layout, stacked
        merge-on-read deletes — whose key-tombstones would wrongly erase
        matching NEW rows if the old files were kept as-is) the append
        falls back to the materializing path: read through, union,
        rewrite.

        ``identity`` (Delta GENERATED ALWAYS AS IDENTITY): name a column
        the TABLE assigns — the batch must NOT carry it. Each batch gets
        dense int64 ids continuing from the manifest's per-column high
        watermark; assignment is distributed (partition-offset
        ``mapInPandas``, no global sort — :func:`_with_contiguous_ids`)
        and race-safe: a lost commit race re-reads the winner's
        watermark and re-assigns, so concurrent identity writers can
        never mint the same id. Deletes never free ids (watermark only
        grows). Identity appends ride the AddFile-only path exclusively
        and reject merge_schema / hive-partitioned / column-mapped
        parents."""
        from pyspark.sql import functions as F

        # GENERATED columns: compute any the batch lacks BEFORE schema
        # comparison, so generated tables keep the O(batch) AddFile path
        # (and materializing unions don't fail on the missing column).
        # _try_commit recomputes/enforces as the backstop either way.
        _p0 = self.current_version()
        if _p0 is not None:
            for _c, _e in (self._manifest(_p0).get("generated") or {}).items():
                if _c not in df.columns:
                    df = df.withColumn(_c, F.expr(_e))
            # DEFAULT columns: same early fill, same reason — a batch
            # legitimately arriving without the column must stay on the
            # O(batch) AddFile path, not trip the schema comparison.
            for _c, _e in (self._manifest(_p0).get("defaults") or {}).items():
                if _c not in df.columns:
                    df = df.withColumn(_c, F.expr(_e))

        if identity is not None:
            if merge_schema:
                raise ValueError("identity appends cannot merge_schema")
            if identity in df.columns:
                raise ValueError(
                    f"identity column {identity!r} is table-assigned; "
                    "the batch must not carry it"
                )
            return self._append_identity(df, identity, txn)

        for _ in range(5):
            parent = self.current_version()
            if parent is None or merge_schema:
                break
            if txn is not None:
                last = self._txn_state(parent).get(txn[0])
                if last is not None and int(last) >= txn[1]:
                    return parent  # replay — already applied
            p_entry = self._manifest(parent)
            hidden_spec = p_entry.get("hidden_partition")
            if (
                self._is_mor(p_entry)
                # HIDDEN-partitioned parents stay AddFile-eligible: the new
                # batch writes its OWN dir with the same derived hive
                # layout (read_hidden plans per chained directory), so an
                # hourly append to a hidden-partitioned 100 TB table costs
                # the hour, not a full rewrite. Plain hive (user-visible
                # partition_by) still materializes: its partition VALUES
                # live only in dir names, and multi-root hive reads need
                # per-dir planning the plain read paths don't do.
                or (p_entry.get("partition_by") and not hidden_spec)
                or p_entry.get("column_renames")
                or p_entry.get("column_drops")
            ):
                # renamed/dropped parents: new files would carry LOGICAL
                # names next to physical-named base files — materialize
                # instead (which also clears the mapping)
                break
            if p_entry.get("file_granular") and self._n_files(p_entry) is None:
                break  # explicit list lost: only a materialize is safe
            cur_schema = self.read_version(parent).schema
            cur_types = {f.name: f.dataType for f in cur_schema.fields}
            new_types = {f.name: f.dataType for f in df.schema.fields}
            if cur_types != new_types:
                break  # widening/retype → materializing path
            p_files = self._file_stats_list(p_entry)  # resolves chunking
            if p_files is not None:
                p_dir = p_entry["data_dir"]
                p_files = [
                    f if "dir" in f else {**f, "dir": p_dir} for f in p_files
                ]
            # parent column order: multi-dir parquet reads resolve
            # columns by name, but keep the files uniform anyway
            staged = df.select(*[f.name for f in cur_schema.fields])
            pb = None
            if hidden_spec:
                # re-derive the parent's hidden transform column so the
                # new dir carries the SAME hive layout — read_hidden
                # prunes each chained dir by its own subdirectories
                staged = staged.withColumn(
                    hidden_spec["name"], _hidden_partition_col(hidden_spec)
                )
                pb = [hidden_spec["name"]]
            try:
                return self._try_commit(
                    staged,
                    "append",
                    parent,
                    txn=None if txn is None else {txn[0]: txn[1]},
                    modified_keys=[],
                    partition_by=pb,
                    hidden_partition=hidden_spec,
                    cdf_df=(
                        df.withColumn("_change_type", F.lit("insert"))
                        if self._record_cdf
                        else None
                    ),
                    base=(
                        [*p_entry.get("base_dirs", []), p_entry["data_dir"]],
                        p_files,
                        p_entry["n_rows"],
                    ),
                    # appends onto an optimize snapshot STAY O(batch):
                    # the child keeps the explicit-file-list contract
                    file_granular=bool(p_entry.get("file_granular")),
                )
            except CommitConflict:
                continue  # rebase onto the race winner and retry
        else:
            raise CommitConflict(
                f"lost 5 consecutive commit races at {self.path}"
            )

        # TYPE WIDENING (Delta's type-widening matrix, enforced): the
        # materializing union coerces mismatched column types to a common
        # one, which for NUMERIC ladders (int→long, float→double,
        # int→double) is the wanted widening — but Spark's coercion would
        # ALSO happily resolve int vs string to STRING, silently retyping
        # the whole table from one bad batch. Allow exactly the lossless-
        # ish numeric widenings; reject every other retype loudly.
        _p1 = self.current_version()
        if _p1 is not None:
            _INT_LADDER = ["tinyint", "smallint", "int", "bigint"]
            _cur_t = dict(self.read_version(_p1).dtypes)
            for _c, _new in df.dtypes:
                _old = _cur_t.get(_c)
                if _old is None or _old == _new:
                    continue
                pair = {_old, _new}
                widenable = (
                    pair <= set(_INT_LADDER)
                    or pair <= {"float", "double"}
                    or (pair & set(_INT_LADDER) and pair & {"float", "double"})
                )
                if not widenable:
                    raise ValueError(
                        f"append would retype column {_c!r} {_old} -> "
                        f"union({_old}, {_new}); only numeric widening is "
                        "allowed — cast the batch explicitly if this is "
                        "intended"
                    )

        def build(cur: DataFrame | None) -> DataFrame:
            if cur is None:
                return df
            if merge_schema:
                return cur.unionByName(df, allowMissingColumns=True)
            return cur.unionByName(df)

        # modified_keys=[]: a blind append touches no existing keys, so it
        # never conflicts with a serializable merge (WriteSerializable).
        return self._commit_with_retry(
            build, "append", txn=txn, modified_keys=[], inherit_layout=True,
            cdf_build=lambda cur: df.withColumn("_change_type", F.lit("insert")),
        )

    def _append_identity(
        self, df: DataFrame, col: str, txn: tuple[str, int] | None
    ) -> int:
        """Identity-assigning append (see :meth:`append`). The batch is
        persisted so the two assignment passes (count-per-partition,
        stamping) and the staged write all see one materialization —
        and so a re-assignment after a lost commit race is cheap."""
        from pyspark.sql import functions as F

        df = df.persist()
        try:
            for _ in range(5):
                parent = self.current_version()
                if txn is not None:
                    last = self._txn_state(parent).get(txn[0])
                    if last is not None and int(last) >= txn[1]:
                        return parent  # replay — already applied
                p_entry = self._manifest(parent) if parent else {}
                if (
                    self._is_mor(p_entry)
                    or p_entry.get("file_granular")
                    or p_entry.get("partition_by")
                    or p_entry.get("column_renames")
                    or p_entry.get("column_drops")
                ):
                    raise ValueError(
                        "identity appends require an AddFile-eligible "
                        "parent (no hive layout, pending deletion "
                        "vectors, or column mapping)"
                    )
                wm = int(p_entry.get("identity", {}).get(col, 1))
                assigned, n = _with_contiguous_ids(df, col, wm)
                if parent:
                    cur_schema = self.read_version(parent).schema
                    if {f.name: f.dataType for f in cur_schema.fields} != {
                        f.name: f.dataType for f in assigned.schema.fields
                    }:
                        raise ValueError(
                            "identity append batch schema must match the "
                            "table (minus the identity column)"
                        )
                    assigned = assigned.select(
                        *[f.name for f in cur_schema.fields]
                    )
                    p_files = self._file_stats_list(p_entry)
                    if p_files is not None:
                        p_dir = p_entry["data_dir"]
                        p_files = [
                            f if "dir" in f else {**f, "dir": p_dir}
                            for f in p_files
                        ]
                    base = (
                        [*p_entry.get("base_dirs", []), p_entry["data_dir"]],
                        p_files,
                        p_entry["n_rows"],
                    )
                else:
                    base = None
                try:
                    return self._try_commit(
                        assigned,
                        "append",
                        parent,
                        txn=None if txn is None else {txn[0]: txn[1]},
                        modified_keys=[],
                        cdf_df=(
                            assigned.withColumn("_change_type", F.lit("insert"))
                            if self._record_cdf
                            else None
                        ),
                        base=base,
                        identity_update={
                            **p_entry.get("identity", {}),
                            col: wm + n,
                        },
                    )
                except CommitConflict:
                    continue  # winner advanced the watermark: re-assign
            raise CommitConflict(
                f"lost 5 consecutive commit races at {self.path}"
            )
        finally:
            df.unpersist()

    @staticmethod
    def _any_col_differs(a: str, b: str, cols: list[str]):
        """Null-safe 'any value column differs' predicate between two
        aliased sides — the same comparison :meth:`changes` uses."""
        from functools import reduce

        from pyspark.sql import functions as F

        terms = [
            ~F.col(f"{a}.{c}").eqNullSafe(F.col(f"{b}.{c}")) for c in cols
        ]
        return reduce(lambda x, y: x | y, terms) if terms else F.lit(False)

    def _merge_cdf(self, cur: DataFrame | None, updates: DataFrame, keys: list[str]) -> DataFrame:
        """Row-level delta of a plain MERGE against the current snapshot:
        unmatched keys -> insert; matched keys whose value columns differ
        -> update_preimage (current row) + update_postimage (update row).
        Cost: one key-join of the UPDATE BATCH against the snapshot — the
        work the merge itself already does, not an extra table diff."""
        from pyspark.sql import functions as F

        if cur is None:
            return updates.withColumn("_change_type", F.lit("insert"))
        val_cols = [c for c in updates.columns if c not in keys]
        u, c = updates.alias("u"), cur.alias("c")
        inserts = u.join(c, on=keys, how="left_anti").select(
            *keys, *[F.col(f"u.{v}") for v in val_cols]
        ).withColumn("_change_type", F.lit("insert"))
        matched = u.join(c, on=keys, how="inner")
        changed = matched.filter(self._any_col_differs("u", "c", val_cols))
        pre = changed.select(
            *keys, *[F.col(f"c.{v}").alias(v) for v in val_cols]
        ).withColumn("_change_type", F.lit("update_preimage"))
        post = changed.select(
            *keys, *[F.col(f"u.{v}").alias(v) for v in val_cols]
        ).withColumn("_change_type", F.lit("update_postimage"))
        return inserts.unionByName(pre).unionByName(post)

    # Fingerprint cap: above this many distinct keys the write set is
    # recorded as unknown (None), which conservatively conflicts with any
    # concurrent serializable merge. Keeps manifests bounded.
    _KEY_FP_CAP = 100_000

    def _key_fingerprints(self, df: DataFrame, keys: list[str]) -> list[int] | None:
        from pyspark.sql import functions as F

        rows = (
            df.select(F.xxhash64(*keys).alias("h"))
            .distinct()
            .limit(self._KEY_FP_CAP + 1)
            .collect()
        )
        if len(rows) > self._KEY_FP_CAP:
            return None
        return sorted(r.h for r in rows)

    def merge(
        self,
        updates: DataFrame,
        keys: list[str],
        order_by: list | None = None,
        txn: tuple[str, int] | None = None,
        isolation: str = "snapshot",
        merge_schema: bool = False,
    ) -> int:
        """MERGE INTO: update matched keys, insert new (S7 on a table).

        With ``order_by`` (names or Column expressions), the merge is
        conditional — ``WHEN MATCHED AND update is first under order_by
        THEN UPDATE`` — so replaying out-of-order micro-batches cannot
        regress a key to an older row (the streaming-upsert contract).

        ``isolation``: ``"snapshot"`` (default) rebase-retries every lost
        race — correct when merges are commutative per key (disjoint
        writers, or last-writer-wins with ``order_by``). ``"serializable"``
        additionally records this merge's key fingerprints in the manifest
        and, on a lost race, raises :class:`ConcurrentMergeConflict` if
        any intervening commit touched an overlapping (or unknown) key
        set — two writers MERGEing the same keys cannot both commit, the
        Delta conflict-detection contract. Disjoint-key writers still all
        commit via rebase.

        ``merge_schema=True`` is Delta's MERGE schema auto-evolution
        (``spark.databricks.delta.schema.autoMerge``) for the
        source-gained-a-column case: ``updates`` may carry NEW columns,
        which existing target rows take as NULL. The source must still
        be a SUPERSET of the target's columns — a source MISSING target
        columns would silently null them out under replace-row MERGE
        semantics, so that raises instead (partial-column updates are
        ``s7_merge_partial``'s coalesce path, a different verb)."""
        if isolation not in ("snapshot", "serializable"):
            raise ValueError(f"unknown isolation level: {isolation!r}")
        from ..operators.dedup import dedup_keep_first

        serializable = isolation == "serializable"
        modified = self._key_fingerprints(updates, keys) if serializable else None

        def _evolve(cur: DataFrame) -> DataFrame:
            from pyspark.sql import functions as F

            missing_in_src = [c for c in cur.columns if c not in updates.columns]
            if missing_in_src:
                raise ValueError(
                    f"merge_schema source is missing target columns "
                    f"{missing_in_src}; replace-row MERGE would null them — "
                    "use a partial-update merge instead"
                )
            for f in updates.schema.fields:
                if f.name not in cur.columns:
                    cur = cur.withColumn(f.name, F.lit(None).cast(f.dataType))
            return cur

        def build(cur: DataFrame | None) -> DataFrame:
            if cur is None:
                return dedup_keep_first(updates, keys, order_by) if order_by else updates
            if merge_schema:
                cur = _evolve(cur)
            if order_by:
                return merge_upsert_latest(cur, updates, keys, order_by)
            return merge_upsert(cur, updates, keys)

        cdf_build = None
        if self._record_cdf and not order_by:
            # write-time CDF covers the plain-merge path; conditional
            # (order_by) merges may skip updates per-row, so their feed
            # stays diff-based (changes()) rather than guessing.
            cdf_build = lambda cur: self._merge_cdf(cur, updates, keys)  # noqa: E731
        return self._commit_with_retry(
            build, "merge", txn=txn,
            modified_keys=modified, serializable=serializable,
            cdf_build=cdf_build, inherit_layout=True,
        )

    def fold(
        self,
        build: Callable[[DataFrame | None], DataFrame],
        op: str = "fold",
        txn: tuple[str, int] | None = None,
    ) -> int:
        """General custom-merge commit: ``build(current_snapshot_or_None)
        -> new_snapshot``, committed under the same OCC/rebase-retry and
        txn-idempotence machinery as the built-in write modes. The
        public escape hatch for folds the fixed modes can't express
        (e.g. t9's cohort state: MIN-date + array_union months)."""
        return self._commit_with_retry(build, op, txn=txn, inherit_layout=True)

    def merge_aggregate(
        self,
        partials: DataFrame,
        keys: list[str],
        add_cols: list[str],
        txn: tuple[str, int] | None = None,
    ) -> int:
        """Additive MERGE (incremental materialized-aggregate refresh):
        matched keys ADD their partial-aggregate measures, new keys
        insert — ``operators.merge.merge_additive`` committed as a new
        snapshot. Measures are cast back to the partials' dtypes so the
        table schema stays fixed across versions (decimal addition would
        otherwise widen precision every commit)."""
        from ..operators.merge import merge_additive

        ptypes = dict(partials.dtypes)

        def build(cur: DataFrame | None) -> DataFrame:
            if cur is None:
                return partials
            merged = merge_additive(cur, partials, keys, add_cols)
            from pyspark.sql import functions as F

            return merged.select(
                *keys, *[F.col(c).cast(ptypes[c]).alias(c) for c in add_cols]
            )

        return self._commit_with_retry(
            build, "merge_aggregate", txn=txn, inherit_layout=True
        )

    def delete(self, condition, txn: tuple[str, int] | None = None) -> int:
        """DELETE FROM table WHERE condition — the right-to-be-forgotten
        op: commits a new snapshot without the matching rows (old versions
        still hold them until :meth:`vacuum` expires the history; complete
        erasure = delete + vacuum(retain_last=1), exactly Delta's
        documented GDPR recipe)."""
        from pyspark.sql import functions as F

        cond = F.expr(condition) if isinstance(condition, str) else condition

        def build(cur: DataFrame | None) -> DataFrame:
            if cur is None:
                raise ValueError(f"cannot delete from empty table at {self.path}")
            # SQL DELETE semantics: only rows where the predicate is TRUE
            # go; a NULL-predicate row is KEPT (plain ~cond is NULL there,
            # silently deleting it — and inconsistently with the recorded
            # CDF delta below, which correctly captures TRUE rows only)
            return cur.filter(~cond.eqNullSafe(F.lit(True)))

        return self._commit_with_retry(
            build, "delete", txn=txn, inherit_layout=True,
            cdf_build=lambda cur: cur.filter(cond).withColumn(
                "_change_type", F.lit("delete")
            ),
        )

    def delete_mor(
        self,
        condition,
        keys: list[str],
        txn: tuple[str, int] | None = None,
        max_retries: int = 5,
    ) -> int:
        """Merge-on-read DELETE (deletion-vector style): instead of
        rewriting the snapshot (O(table), what :meth:`delete` does), the
        commit writes ONLY a tombstone file of the matched rows' keys —
        O(deleted) — and the manifest points at the PARENT's data
        directory plus the accumulated tombstones. Readers resolve
        data ANTI-JOIN tombstones (:meth:`read_version`); the next
        copy-on-write commit (append/merge/overwrite/compact) reads
        through the tombstones and materializes, clearing them.

        ``keys`` must identify rows uniquely (the same contract MERGE
        has). Same CAS/rebase-retry + txn idempotence as other writes.
        """
        from pyspark.sql import functions as F

        cond = F.expr(condition) if isinstance(condition, str) else condition
        for _ in range(max_retries):
            parent = self.current_version()
            if parent is None:
                raise ValueError(f"cannot delete from empty table at {self.path}")
            if txn is not None:
                last = self._txn_state(parent).get(txn[0])
                if last is not None and int(last) >= txn[1]:
                    return parent  # replay — already applied
            p_entry = self._manifest(parent)
            if p_entry.get("pos_dv_dirs"):
                raise ValueError(
                    "key-based and position-based tombstones do not mix; "
                    "compact first or keep using delete_mor_pos"
                )
            parent_keys = p_entry.get("dv_keys")
            if parent_keys and list(parent_keys) != list(keys):
                raise ValueError(
                    f"stacked merge-on-read deletes must share key columns: "
                    f"parent used {parent_keys}, got {keys}"
                )
            v = parent + 1
            token = uuid.uuid4().hex[:8]
            dv_dirname = f"_dv{v}-{token}"
            dv_dir = os.path.join(self.path, dv_dirname)
            matched = self.read().filter(cond)
            matched.select(*keys).write.mode("overwrite").parquet(dv_dir)
            # record_cdf tables keep their O(|changes|) feed across MOR
            # deletes: the matched rows' full images are the delete deltas
            cdf_dirname = None
            if self._record_cdf:
                cdf_dirname = f"_cdf-v{v}-{token}"
                matched.withColumn("_change_type", F.lit("delete")).write.mode(
                    "overwrite"
                ).parquet(os.path.join(self.path, cdf_dirname))
            os.makedirs(self._manifest_dir, exist_ok=True)
            entry = {
                "version": v,
                "operation": "delete_mor",
                "parent": parent,
                "n_rows": p_entry["n_rows"] - _parquet_num_rows(dv_dir),
                "data_dir": p_entry.get("data_dir", f"_v{parent}"),
                # the data files are untouched, so their LAYOUT metadata
                # must ride along — dropping it made a later compact()
                # silently rewrite a partitioned snapshot unpartitioned
                # (and orphan a hidden-partition spec from its hive dirs)
                "partition_by": p_entry.get("partition_by"),
                "cluster_by": p_entry.get("cluster_by"),
                # incremental-append parents: keep their whole dir chain
                **(
                    {"base_dirs": p_entry["base_dirs"]}
                    if p_entry.get("base_dirs")
                    else {}
                ),
                # renamed/dropped parents: tombstone keys are LOGICAL, so
                # the mapping must ride along for the anti-join to bind
                **(
                    {"column_renames": p_entry["column_renames"]}
                    if p_entry.get("column_renames")
                    else {}
                ),
                **(
                    {"column_drops": p_entry["column_drops"]}
                    if p_entry.get("column_drops")
                    else {}
                ),
                **(
                    {"checks": p_entry["checks"]}
                    if p_entry.get("checks")
                    else {}
                ),
                **(
                    {"uniques": p_entry["uniques"]}
                    if p_entry.get("uniques")
                    else {}
                ),
                **(
                    {"generated": p_entry["generated"]}
                    if p_entry.get("generated")
                    else {}
                ),
                **(
                    {"defaults": p_entry["defaults"]}
                    if p_entry.get("defaults")
                    else {}
                ),
                **(
                    {"identity": p_entry["identity"]}
                    if p_entry.get("identity")
                    else {}
                ),
                **(
                    {"hidden_partition": p_entry["hidden_partition"]}
                    if p_entry.get("hidden_partition")
                    else {}
                ),
                "dv_dirs": p_entry.get("dv_dirs", []) + [dv_dirname],
                "dv_keys": keys,
                "committed_at": time.time(),
                "txn": dict(self._txn_state(parent), **({txn[0]: txn[1]} if txn else {})),
            }
            entry["cdf_dir"] = cdf_dirname
            chunk_paths: list[str] = []
            if p_entry.get("file_granular"):
                # keyed MOR over an optimize snapshot: the explicit list
                # rides the manifest for read resolution (see
                # delete_mor_pos; pruning ignores MOR stats via _is_mor)
                entry["file_granular"] = True
                chunk_paths = self._attach_file_stats(
                    entry, self._file_stats_list(p_entry), v, token
                )
            tmp = os.path.join(self._manifest_dir, f".v{v}.{token}.json.tmp")
            with open(tmp, "w") as f:
                json.dump(entry, f)
            final = os.path.join(self._manifest_dir, f"v{v}.json")
            try:
                if self._link_version_slot(tmp, final, v):
                    return v
                shutil.rmtree(dv_dir, ignore_errors=True)
                if cdf_dirname:
                    shutil.rmtree(
                        os.path.join(self.path, cdf_dirname), ignore_errors=True
                    )
                for cp in chunk_paths:
                    try:
                        os.unlink(cp)
                    except FileNotFoundError:
                        pass
                continue  # rebase: re-evaluate condition on the winner's snapshot
            finally:
                os.unlink(tmp)
        raise CommitConflict(f"lost {max_retries} consecutive commit races at {self.path}")

    def _hilbert_domain_chain(self, entry: dict) -> dict | None:
        """Walk the parent chain for the most recent ``hilbert_domain``
        (appends don't carry it; the domain is a property of the layout
        lineage, not of any one commit). Driver-side O(versions)."""
        e = entry
        while e is not None:
            d = e.get("hilbert_domain")
            if d:
                return d
            p = e.get("parent")
            e = self._manifest(p) if p is not None else None
        return None

    def optimize_incremental(
        self,
        col,
        rows_per_file: int = 1_000_000,
        max_retries: int = 5,
        layout: str = "range",
    ) -> dict:
        """Liquid-clustering-style INCREMENTAL OPTIMIZE: rewrite ONLY the
        files whose ``col`` key ranges OVERLAP another file's — the
        unclustered tail that appends create — and carry every already
        well-clustered file by reference. A full `compact()` is O(table)
        every run; at 100 TB with hourly appends, the overlap set is the
        last few appends, so this is O(new data) like the appends
        themselves (Databricks OPTIMIZE / Iceberg binpack-with-sort make
        the same trade).

        The committed manifest is FILE-GRANULAR (``file_granular``:
        readers resolve the explicit file list, not directories) because
        the rewritten originals still sit inside a directory other live
        entries reference. Space for superseded originals is reclaimed
        when their last referencing version expires (vacuum), as in
        Delta. Overlap planning is pure driver math over the manifest's
        per-file bounds — no listing, no data reads for untouched files.

        Returns ``{"version", "rewritten", "carried", "groups"}``;
        a fully-clustered table is a NO-OP (version unchanged).
        Requires per-file stats and no pending tombstones; hive/hidden
        layouts keep their directory grain — use :func:`compact`.

        ``layout="hilbert"`` (r11, the liquid-clustering completion):
        ``col`` is a PAIR of columns and the re-cluster key is the
        Hilbert curve distance over a FIXED min-max domain persisted in
        the manifest (``hilbert_domain``, found by parent-chain walk so
        appends need not carry it). Each clustered file records its
        curve-distance interval as a synthetic stats key
        (``__hilbert__``), so overlap planning is the SAME 1-D interval
        math — and files appended since the last optimize simply lack
        the key, making them exactly the rewrite tail: the run stays
        O(new data). Data outside the stored domain clamps to the edge
        cell (a clustering-quality concern only — read pruning uses the
        real columns' min/max); if the table's bounds outgrow the
        domain, the domain re-derives (with headroom) and every
        curve-distance stat is invalidated — one full re-layout, then
        incremental again. Why Hilbert over re-sorting one column: the
        curve is continuous, so each file covers a tight 2-D rectangle
        and min/max skipping works on EITHER dimension."""
        from pyspark.sql import functions as F

        _HKEY = "__hilbert__"
        hilbert = layout == "hilbert"
        if layout not in ("range", "hilbert"):
            raise ValueError(f"unknown optimize layout {layout!r}")
        if hilbert:
            if isinstance(col, str) or len(col) != 2:
                raise ValueError(
                    "layout='hilbert' clusters exactly two columns; "
                    "pass col=(c1, c2)"
                )
            cols = list(col)
        elif not isinstance(col, str):
            raise ValueError("layout='range' clusters one column")

        for _ in range(max_retries):
            parent = self.current_version()
            if parent is None:
                raise ValueError(f"cannot optimize empty table {self.path}")
            p_entry = self._manifest(parent)
            if self._is_mor(p_entry):
                raise ValueError(
                    "optimize over pending deletion tombstones would "
                    "materialize them per-group; compact first"
                )
            if p_entry.get("partition_by") or p_entry.get("hidden_partition"):
                raise ValueError(
                    "incremental optimize is for unpartitioned clustered "
                    "layouts; hive/hidden tables compact per directory"
                )
            files = self._file_stats_list(p_entry)
            if not files:
                raise ValueError(
                    "incremental optimize plans from per-file stats; "
                    "this manifest carries none"
                )
            p_dir = p_entry["data_dir"]
            files = [f if "dir" in f else {**f, "dir": p_dir} for f in files]

            domain = None
            if hilbert:
                physs = [self._physical_name(p_entry, c) for c in cols]
                # table bounds from the MANIFEST's per-file stats — zero
                # data reads at plan time (files without stats for the
                # cluster columns only affect clustering quality: their
                # out-of-domain values clamp to the domain edge)
                mins, maxs = [], []
                for ph in physs:
                    vals = [
                        f["stats"][ph]
                        for f in files
                        if f["stats"].get(ph, [None, None])[0] is not None
                    ]
                    if not vals:
                        raise ValueError(
                            f"hilbert optimize needs per-file stats for "
                            f"{ph}; this manifest carries none"
                        )
                    mins.append(float(min(v[0] for v in vals)))
                    maxs.append(float(max(v[1] for v in vals)))
                stored = self._hilbert_domain_chain(p_entry)
                invalidated = False
                if (
                    stored
                    and stored["cols"] == cols
                    and all(
                        b[0] <= mn and mx <= b[1]
                        for b, mn, mx in zip(stored["bounds"], mins, maxs)
                    )
                ):
                    domain = stored
                else:
                    # first hilbert run, different cols, or data outgrew
                    # the domain: re-derive with 25% upper headroom (most
                    # growing dimensions — time, ids — grow upward) and
                    # invalidate every curve-distance stat → one full
                    # re-layout under the new scaling, then incremental.
                    domain = {
                        "cols": cols,
                        "bounds": [
                            [mn, mx + 0.25 * ((mx - mn) or 1.0)]
                            for mn, mx in zip(mins, maxs)
                        ],
                    }
                    invalidated = True
                plan_key = _HKEY
            else:
                phys = self._physical_name(p_entry, col)
                plan_key = phys

            # ---- overlap planning: pure driver interval math ----
            known = [
                f
                for f in files
                if not (hilbert and invalidated)
                and f["stats"].get(plan_key, [None, None])[0] is not None
            ]
            _known_ids = {id(f) for f in known}
            unknown = [  # no usable bounds: conservatively rewrite
                f for f in files if id(f) not in _known_ids
            ]
            _ubase = [os.path.basename(f["path"]) for f in unknown]
            if (
                hilbert
                and unknown
                and not invalidated
                # basenames key the scan results; Spark part files embed a
                # job UUID so collisions don't happen in practice — if one
                # ever does, fall back to the blind rewrite (correct,
                # just less incremental)
                and len(set(_ubase)) == len(_ubase)
            ):
                # Appended-since-last-optimize files carry no curve-distance
                # stats. Rewriting them BLIND makes one wide-d file that
                # overlaps every clustered file and forces a full rewrite
                # NEXT run (measured in the r11 smoke). Instead, one scan
                # of exactly the new files (O(new data) — the same bytes
                # the rewrite reads anyway) computes their real d-intervals
                # so interval grouping pulls in only the clustered files
                # they genuinely overlap: a localized append (new days)
                # rewrites a few files; a domain-spanning random append
                # rewrites what it truly touches — and converges in ONE
                # run either way. A new file that lands tight and disjoint
                # is simply carried, d-stats attached, zero bytes moved.
                from ..operators.zorder import _scaled, hilbert_value

                _uh = hilbert_value(
                    *[
                        _scaled(ph, b[0], b[1])
                        for ph, b in zip(physs, domain["bounds"])
                    ]
                )
                ubounds = {
                    os.path.basename(r["__f"]): (int(r["lo"]), int(r["hi"]))
                    for r in self.spark.read.parquet(
                        *[
                            os.path.join(self.path, f["dir"], f["path"])
                            for f in unknown
                        ]
                    )
                    .select(
                        F.col("_metadata.file_path").alias("__f"),
                        _uh.alias("__h"),
                    )
                    .groupBy("__f")
                    .agg(F.min("__h").alias("lo"), F.max("__h").alias("hi"))
                    .collect()
                }
                still_unknown = []
                for f in unknown:
                    b = ubounds.get(os.path.basename(f["path"]))
                    if b is None:  # several unknowns sharing a basename
                        still_unknown.append(f)
                    else:
                        f["stats"] = {**f["stats"], plan_key: list(b)}
                        known.append(f)
                unknown = still_unknown
            known.sort(key=lambda f: f["stats"][plan_key][0])
            groups: list[list[dict]] = []
            for f in known:
                lo, hi = f["stats"][plan_key]
                if groups and lo <= groups[-1][-1]["__hi"]:
                    groups[-1].append({**f, "__hi": max(hi, groups[-1][-1]["__hi"])})
                else:
                    groups.append([{**f, "__hi": hi}])
            rewrite = [
                {k: v for k, v in f.items() if k != "__hi"}
                for g in groups
                if len(g) > 1
                for f in g
            ] + unknown
            carried = [
                {k: v for k, v in g[0].items() if k != "__hi"}
                for g in groups
                if len(g) == 1
            ]
            if not rewrite:
                return {
                    "version": parent,
                    "rewritten": 0,
                    "carried": len(carried),
                    "groups": 0,
                }

            v = parent + 1
            token = uuid.uuid4().hex[:8]
            data_dirname = f"_v{v}-{token}"
            data_dir = os.path.join(self.path, data_dirname)
            n_rewrite_rows = sum(f["n_rows"] for f in rewrite)
            n_out = max(1, -(-n_rewrite_rows // rows_per_file))
            self.spark.conf.set(
                "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
            )
            src = self.spark.read.parquet(
                *[os.path.join(self.path, f["dir"], f["path"]) for f in rewrite]
            )
            if hilbert:
                from ..operators.zorder import _scaled, hilbert_value

                _hexpr = lambda: hilbert_value(  # noqa: E731
                    *[
                        _scaled(ph, b[0], b[1])
                        for ph, b in zip(physs, domain["bounds"])
                    ]
                )
                laid = (
                    src.withColumn("__h", _hexpr())
                    .repartitionByRange(n_out, F.col("__h"))
                    .sortWithinPartitions("__h")
                    .drop("__h")
                )
            else:
                laid = src.repartitionByRange(n_out, F.col(phys))
            laid.write.mode("overwrite").parquet(data_dir)
            n_new_rows, new_files = _collect_manifest_stats(data_dir)
            if hilbert and new_files is not None:
                # one extra pass over the REWRITTEN files only (O(changed))
                # to record each new file's curve-distance interval — the
                # synthetic stats key the next run's overlap planning
                # reads. The data schema stays clean: __h never persists.
                hb = {
                    os.path.basename(r["__f"]): (r["lo"], r["hi"])
                    for r in self.spark.read.parquet(data_dir)
                    .select(
                        F.col("_metadata.file_path").alias("__f"),
                        _hexpr().alias("__h"),
                    )
                    .groupBy("__f")
                    .agg(F.min("__h").alias("lo"), F.max("__h").alias("hi"))
                    .collect()
                }
                for f in new_files:
                    lo_hi = hb.get(os.path.basename(f["path"]))
                    if lo_hi is not None:
                        f["stats"][_HKEY] = [int(lo_hi[0]), int(lo_hi[1])]
            if n_new_rows != n_rewrite_rows:
                # NOT an assert: under `python -O` an assert vanishes and a
                # stats/rewrite mismatch would commit a corrupt
                # file-granular snapshot silently — and the staged data_dir
                # must not leak on the failure path (r10 ADVICE low).
                shutil.rmtree(data_dir, ignore_errors=True)
                raise RuntimeError(
                    f"incremental optimize row-preservation violated: "
                    f"rewrote {n_rewrite_rows} rows but the new files hold "
                    f"{n_new_rows}; manifest stats and data disagree at "
                    f"{self.path}"
                )
            all_files = [
                *carried,
                *({**f, "dir": data_dirname} for f in new_files or []),
            ]
            entry = {
                "version": v,
                "operation": "optimize",
                "parent": parent,
                "n_rows": p_entry["n_rows"],
                "data_dir": data_dirname,
                # liveness roots for vacuum: every dir a carried file
                # lives in stays referenced while this version is live
                "base_dirs": sorted({f["dir"] for f in carried}),
                "partition_by": None,
                "cluster_by": cols if hilbert else [col],
                **({"hilbert_domain": domain} if hilbert else {}),
                "cdf_dir": None,
                # readers resolve the EXPLICIT file list — the carried
                # dirs also hold superseded originals
                "file_granular": True,
                "committed_at": time.time(),
                "modified_keys": [],  # row-preserving: never conflicts
                "txn": dict(self._txn_state(parent)),
                **(
                    {"column_renames": p_entry["column_renames"]}
                    if p_entry.get("column_renames")
                    else {}
                ),
                **(
                    {"column_drops": p_entry["column_drops"]}
                    if p_entry.get("column_drops")
                    else {}
                ),
                **({"checks": p_entry["checks"]} if p_entry.get("checks") else {}),
                **({"uniques": p_entry["uniques"]} if p_entry.get("uniques") else {}),
                **(
                    {"generated": p_entry["generated"]}
                    if p_entry.get("generated")
                    else {}
                ),
                **(
                    {"defaults": p_entry["defaults"]}
                    if p_entry.get("defaults")
                    else {}
                ),
                **(
                    {"identity": p_entry["identity"]}
                    if p_entry.get("identity")
                    else {}
                ),
            }
            chunk_paths = self._attach_file_stats(entry, all_files, v, token)
            os.makedirs(self._manifest_dir, exist_ok=True)
            tmp = os.path.join(self._manifest_dir, f".v{v}.{token}.json.tmp")
            with open(tmp, "w") as f:
                json.dump(entry, f)
            final = os.path.join(self._manifest_dir, f"v{v}.json")
            try:
                if self._link_version_slot(tmp, final, v):
                    return {
                        "version": v,
                        "rewritten": len(rewrite),
                        "carried": len(carried),
                        "groups": sum(1 for g in groups if len(g) > 1)
                        + (1 if unknown else 0),
                    }
                shutil.rmtree(data_dir, ignore_errors=True)
                for cp in chunk_paths:
                    try:
                        os.unlink(cp)
                    except FileNotFoundError:
                        pass
                continue  # rebase onto the winner's snapshot
            finally:
                os.unlink(tmp)
        raise CommitConflict(
            f"lost {max_retries} consecutive commit races at {self.path}"
        )

    def update_mor(
        self,
        condition,
        set_exprs: dict[str, str],
        txn: tuple[str, int] | None = None,
        max_retries: int = 5,
    ) -> int:
        """Merge-on-read UPDATE (Delta's deletion-vector UPDATE): ONE
        commit that (a) position-tombstones the matched rows and
        (b) appends their updated images as new files — O(changed) I/O,
        the table's data files untouched. A copy-on-write UPDATE rewrites
        every file containing a matched row (at 100 TB, often most of
        them); this touches exactly the changed rows twice (tombstone
        keys + new images). Readers resolve base MINUS positions PLUS
        the update directory in the same anti-join pass read_version
        already does; compaction materializes as usual.

        ``set_exprs``: {column: SQL expression} applied to matched rows
        (expressions may reference any column). Same stacking rules as
        :meth:`delete_mor_pos` (position tombstones only; no mixing with
        keyed tombstones; compact off a file-granular snapshot first)."""
        from pyspark.sql import functions as F

        cond = F.expr(condition) if isinstance(condition, str) else condition
        for _ in range(max_retries):
            parent = self.current_version()
            if parent is None:
                raise ValueError(f"cannot update empty table at {self.path}")
            if txn is not None:
                last = self._txn_state(parent).get(txn[0])
                if last is not None and int(last) >= txn[1]:
                    return parent  # replay — already applied
            p_entry = self._manifest(parent)
            if p_entry.get("dv_dirs"):
                raise ValueError(
                    "key-based and position-based tombstones do not mix; "
                    "compact first"
                )
            if p_entry.get("column_renames") or p_entry.get("column_drops"):
                raise ValueError(
                    "merge-on-read updates next to column mapping would mix "
                    "physical- and logical-named files in one scan; "
                    "compact first"
                )
            v = parent + 1
            token = uuid.uuid4().hex[:8]
            dv_dirname = f"_dvp{v}-{token}"
            upd_dirname = f"_v{v}-{token}"
            dv_dir = os.path.join(self.path, dv_dirname)
            upd_dir = os.path.join(self.path, upd_dirname)
            matched = self._read_with_positions(p_entry).filter(cond)
            # (a) tombstone the old images by position …
            matched.select("__pos_f", "__pos_ri").write.mode("overwrite").parquet(
                dv_dir
            )
            # … (b) append the new images (post-update), schema-aligned
            logical_cols = [
                c for c in matched.columns if c not in ("__pos_f", "__pos_ri")
            ]
            gen = p_entry.get("generated") or {}
            if bad := [c for c in set_exprs if c in gen]:
                raise ValueError(
                    f"cannot SET generated columns {bad}; they are always "
                    "recomputed from their expressions (Delta contract)"
                )
            updated = matched.select(
                *[
                    F.expr(set_exprs[c]).alias(c) if c in set_exprs else F.col(c)
                    for c in logical_cols
                ]
            )
            for c, e in gen.items():
                # generated columns track their SOURCES through the update
                updated = updated.withColumn(c, F.expr(e))
            if checks := p_entry.get("checks"):
                from .constraints import enforce

                enforce(updated, checks)  # updates must keep passing
            self.spark.conf.set(
                "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
            )
            # inherit_layout: a hive/hidden parent's update directory is
            # written WITH the parent's layout re-derived (hidden specs
            # recompute the engine column from its source), so the
            # snapshot never mixes partitioned and flat dirs — a real
            # lakehouse updates partitioned tables in place, no
            # compact-first detour (the r9 guard this replaces)
            hidden_spec = p_entry.get("hidden_partition")
            pb = p_entry.get("partition_by")
            to_write = updated
            if hidden_spec:
                to_write = updated.withColumn(
                    hidden_spec["name"], _hidden_partition_col(hidden_spec)
                )
            w = to_write.write.mode("overwrite")
            if pb:
                w = w.partitionBy(*pb)
            w.parquet(upd_dir)
            n_changed = _parquet_num_rows(upd_dir)
            # record_cdf tables keep their O(|changes|) feed across the MOR
            # verb: write preimages (matched, pre-update) + postimages
            # (updated) in the SAME commit, exactly what a copy-on-write
            # merge records — changes_feed composes them unchanged
            cdf_dirname = None
            if self._record_cdf:
                cdf_dirname = f"_cdf-v{v}-{token}"
                (
                    matched.select(*logical_cols)
                    .withColumn("_change_type", F.lit("update_preimage"))
                    .unionByName(
                        updated.withColumn(
                            "_change_type", F.lit("update_postimage")
                        )
                    )
                    .write.mode("overwrite")
                    .parquet(os.path.join(self.path, cdf_dirname))
                )
            os.makedirs(self._manifest_dir, exist_ok=True)
            entry = {
                "version": v,
                "operation": "update_mor",
                "parent": parent,
                "n_rows": p_entry["n_rows"],  # row-count preserving
                # the update dir joins the readable set; the parent's
                # whole dir chain carries forward
                "data_dir": upd_dirname,
                "base_dirs": [
                    *p_entry.get("base_dirs", []),
                    p_entry.get("data_dir", f"_v{parent}"),
                ],
                # layout rides the manifest (the r8 delete_mor lesson: the
                # data files are untouched, so dropping it made a later
                # compact silently rewrite a partitioned snapshot flat)
                "partition_by": pb,
                "cluster_by": None,
                **({"hidden_partition": hidden_spec} if hidden_spec else {}),
                "cdf_dir": None,
                **(
                    {"column_renames": p_entry["column_renames"]}
                    if p_entry.get("column_renames")
                    else {}
                ),
                **(
                    {"column_drops": p_entry["column_drops"]}
                    if p_entry.get("column_drops")
                    else {}
                ),
                **({"checks": p_entry["checks"]} if p_entry.get("checks") else {}),
                **({"uniques": p_entry["uniques"]} if p_entry.get("uniques") else {}),
                **(
                    {"generated": p_entry["generated"]}
                    if p_entry.get("generated")
                    else {}
                ),
                **(
                    {"defaults": p_entry["defaults"]}
                    if p_entry.get("defaults")
                    else {}
                ),
                **(
                    {"identity": p_entry["identity"]}
                    if p_entry.get("identity")
                    else {}
                ),
                "pos_dv_dirs": p_entry.get("pos_dv_dirs", []) + [dv_dirname],
                "n_updated": n_changed,
                "committed_at": time.time(),
                "modified_keys": None,  # unknown write set (like overwrite)
                "txn": dict(
                    self._txn_state(parent), **({txn[0]: txn[1]} if txn else {})
                ),
            }
            entry["cdf_dir"] = cdf_dirname
            chunk_paths: list[str] = []
            if p_entry.get("file_granular"):
                # MOR update over an optimize snapshot: the explicit list
                # carries forward PLUS the update dir's new image files —
                # readers resolve list MINUS positions PLUS nothing else
                # (see delete_mor_pos; chunks re-attach per-version)
                entry["file_granular"] = True
                _, upd_files = _collect_manifest_stats(upd_dir)
                composed = [
                    *self._file_stats_list(p_entry),
                    *({**f, "dir": upd_dirname} for f in upd_files or []),
                ]
                chunk_paths = self._attach_file_stats(entry, composed, v, token)
            tmp = os.path.join(self._manifest_dir, f".v{v}.{token}.json.tmp")
            with open(tmp, "w") as f:
                json.dump(entry, f)
            final = os.path.join(self._manifest_dir, f"v{v}.json")
            try:
                if self._link_version_slot(tmp, final, v):
                    return v
                shutil.rmtree(dv_dir, ignore_errors=True)
                shutil.rmtree(upd_dir, ignore_errors=True)
                if cdf_dirname:
                    shutil.rmtree(
                        os.path.join(self.path, cdf_dirname), ignore_errors=True
                    )
                for cp in chunk_paths:
                    try:
                        os.unlink(cp)
                    except FileNotFoundError:
                        pass
                continue  # rebase onto the winner's snapshot
            finally:
                os.unlink(tmp)
        raise CommitConflict(
            f"lost {max_retries} consecutive commit races at {self.path}"
        )

    def _read_with_positions(self, entry: dict) -> DataFrame:
        """The version's LOGICAL rows carrying their physical position
        identity (``__pos_f``, ``__pos_ri`` = row index inside the file,
        from Spark's parquet ``_metadata`` column), with any accumulated
        position tombstones already anti-joined out.

        ``__pos_f`` is TABLE-ROOT-RELATIVE (``<dir-basename>/<subpath>``,
        e.g. ``_v3-ab12cd34/part-00000-….parquet``), NOT the absolute
        ``_metadata.file_path`` URI: every other manifest reference is
        root-relative precisely so a relocated/renamed table keeps
        working, and an absolute tombstone URI silently matches NOTHING
        after a move — resurrecting every deleted/pre-update row with no
        error (the r10 ADVICE medium; Delta deletion vectors and Iceberg
        position deletes store relative paths for the same reason). The
        dir BASENAME (unique per version+token) rather than the manifest
        dir string keeps the identity stable across shallow clones, which
        absolutize carried dir paths."""
        from functools import reduce

        from pyspark.sql import functions as F

        # FILE-GRANULAR (optimize) snapshots resolve the explicit file
        # list — the referenced dirs also hold superseded originals a
        # directory read would resurrect. Group the list per owning dir so
        # the position identity stays <dir-basename>/<filename> either way.
        if entry.get("file_granular"):
            files = self._file_stats_list(entry)
            if files is None:
                raise ValueError(
                    "file-granular snapshot lost its explicit file list; "
                    "compact below the stats cap first"
                )
            by_dir: dict[str, list[str]] = {}
            for f in files:
                by_dir.setdefault(f.get("dir", entry["data_dir"]), []).append(
                    f["path"]
                )
            groups = [(d, paths) for d, paths in by_dir.items()]
        else:
            groups = [
                (d, None)
                for d in [*entry.get("base_dirs", []), entry["data_dir"]]
            ]
        parts = []
        for d, paths in groups:
            absd = os.path.abspath(os.path.join(self.path, d)).rstrip("/")
            ident = os.path.basename(absd)
            # file_path renders as file:/abs or file:///abs — normalize the
            # scheme away, then strip "<absd>/" (1-based substring)
            sub = F.expr(
                "substring(regexp_replace(_metadata.file_path, '^file:/+', '/'), "
                f"{len(absd) + 2})"
            )
            src = (
                self.spark.read.parquet(absd)
                if paths is None
                else self.spark.read.parquet(
                    *[os.path.join(absd, p) for p in paths]
                )
            )
            parts.append(
                src.select(
                    "*",
                    F.concat(F.lit(ident + "/"), sub).alias("__pos_f"),
                    F.col("_metadata.row_index").alias("__pos_ri"),
                )
            )
        df = reduce(lambda a, b: a.unionByName(b), parts)
        df = self._apply_column_mapping(df, entry)
        pos_dirs = entry.get("pos_dv_dirs", [])
        if pos_dirs:
            pdv = self.spark.read.parquet(
                *[os.path.join(self.path, d) for d in pos_dirs]
            ).distinct()
            pdv = pdv.select(
                self._relativize_tombstone(F.col("__pos_f")).alias("__pos_f"),
                "__pos_ri",
            )
            df = df.join(pdv, on=["__pos_f", "__pos_ri"], how="left_anti")
        return df

    def _relativize_tombstone(self, col):
        """Normalize a stored position-tombstone path to the root-relative
        identity. New tombstones are already relative (pass-through); a
        LEGACY absolute URI written by pre-r10 code re-relativizes when it
        resolves under the CURRENT root, and anything else (an absolute
        URI from a root the table has since been moved away from) RAISES
        instead of silently matching nothing and resurrecting rows."""
        from pyspark.sql import functions as F

        root = os.path.abspath(self.path).rstrip("/")
        norm = F.regexp_replace(col, "^file:/+", "/")
        return (
            F.when(~col.rlike("^(file:|/)"), col)
            .when(
                F.substring(norm, 1, len(root) + 1) == F.lit(root + "/"),
                F.substring(norm, len(root) + 2, 2_147_483_647),
            )
            .otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(
                            "position tombstone references a file outside "
                            f"table root {root}: "
                        ),
                        col,
                    )
                )
            )
        )

    def delete_mor_pos(
        self,
        condition,
        txn: tuple[str, int] | None = None,
        max_retries: int = 5,
    ) -> int:
        """Merge-on-read DELETE by POSITION (Iceberg position deletes /
        Delta deletion vectors proper): the tombstone file records
        ``(file, row_index)`` pairs — the rows' PHYSICAL identity from
        the parquet ``_metadata`` column — instead of key values. Same
        O(deleted) commit as :meth:`delete_mor`, with the contract
        difference that matters on real tables: NO unique-key
        requirement. ``delete_mor`` anti-joins on declared key columns
        and is simply unavailable when the table has no unique key
        (event logs, raw crawl dumps, duplicated corpora); position
        identity is unique by construction for every parquet row.
        Readers resolve base ANTI-JOIN positions; the next materializing
        commit (or :func:`compact`) clears them. The two tombstone
        flavors never mix on one version chain — compact between styles.
        Cf. the Iceberg spec's delete-file manifest entries (public)."""
        from pyspark.sql import functions as F

        cond = F.expr(condition) if isinstance(condition, str) else condition
        for _ in range(max_retries):
            parent = self.current_version()
            if parent is None:
                raise ValueError(f"cannot delete from empty table at {self.path}")
            if txn is not None:
                last = self._txn_state(parent).get(txn[0])
                if last is not None and int(last) >= txn[1]:
                    return parent  # replay — already applied
            p_entry = self._manifest(parent)
            if p_entry.get("dv_dirs"):
                raise ValueError(
                    "key-based and position-based tombstones do not mix; "
                    "compact first or keep using delete_mor"
                )
            v = parent + 1
            token = uuid.uuid4().hex[:8]
            dv_dirname = f"_dvp{v}-{token}"
            dv_dir = os.path.join(self.path, dv_dirname)
            # positions of rows matching the predicate, EXCLUDING rows
            # already tombstoned by stacked position deletes
            matched = self._read_with_positions(p_entry).filter(cond)
            matched.select("__pos_f", "__pos_ri").write.mode("overwrite").parquet(
                dv_dir
            )
            cdf_dirname = None
            if self._record_cdf:
                cdf_dirname = f"_cdf-v{v}-{token}"
                matched.drop("__pos_f", "__pos_ri").withColumn(
                    "_change_type", F.lit("delete")
                ).write.mode("overwrite").parquet(
                    os.path.join(self.path, cdf_dirname)
                )
            os.makedirs(self._manifest_dir, exist_ok=True)
            entry = {
                "version": v,
                "operation": "delete_mor_pos",
                "parent": parent,
                "n_rows": p_entry["n_rows"] - _parquet_num_rows(dv_dir),
                "data_dir": p_entry.get("data_dir", f"_v{parent}"),
                "partition_by": p_entry.get("partition_by"),
                "cluster_by": p_entry.get("cluster_by"),
                **(
                    {"base_dirs": p_entry["base_dirs"]}
                    if p_entry.get("base_dirs")
                    else {}
                ),
                **(
                    {"column_renames": p_entry["column_renames"]}
                    if p_entry.get("column_renames")
                    else {}
                ),
                **(
                    {"column_drops": p_entry["column_drops"]}
                    if p_entry.get("column_drops")
                    else {}
                ),
                **({"checks": p_entry["checks"]} if p_entry.get("checks") else {}),
                **({"uniques": p_entry["uniques"]} if p_entry.get("uniques") else {}),
                **(
                    {"generated": p_entry["generated"]}
                    if p_entry.get("generated")
                    else {}
                ),
                **(
                    {"defaults": p_entry["defaults"]}
                    if p_entry.get("defaults")
                    else {}
                ),
                **(
                    {"identity": p_entry["identity"]}
                    if p_entry.get("identity")
                    else {}
                ),
                **(
                    {"hidden_partition": p_entry["hidden_partition"]}
                    if p_entry.get("hidden_partition")
                    else {}
                ),
                "pos_dv_dirs": p_entry.get("pos_dv_dirs", []) + [dv_dirname],
                "committed_at": time.time(),
                "txn": dict(
                    self._txn_state(parent), **({txn[0]: txn[1]} if txn else {})
                ),
            }
            entry["cdf_dir"] = cdf_dirname
            chunk_paths: list[str] = []
            if p_entry.get("file_granular"):
                # MOR over an optimize snapshot (r10 — the compact-first
                # guard is gone): readers resolve the EXPLICIT list MINUS
                # positions, so the list must ride the manifest; chunked
                # stats RE-ATTACH with this commit's identity (per-version
                # chunk invariant). Pruning still ignores MOR stats
                # (_is_mor), so carrying them is resolution, not pruning.
                entry["file_granular"] = True
                chunk_paths = self._attach_file_stats(
                    entry, self._file_stats_list(p_entry), v, token
                )
            tmp = os.path.join(self._manifest_dir, f".v{v}.{token}.json.tmp")
            with open(tmp, "w") as f:
                json.dump(entry, f)
            final = os.path.join(self._manifest_dir, f"v{v}.json")
            try:
                if self._link_version_slot(tmp, final, v):
                    return v
                shutil.rmtree(dv_dir, ignore_errors=True)
                if cdf_dirname:
                    shutil.rmtree(
                        os.path.join(self.path, cdf_dirname), ignore_errors=True
                    )
                for cp in chunk_paths:
                    try:
                        os.unlink(cp)
                    except FileNotFoundError:
                        pass
                continue  # rebase: re-evaluate on the winner's snapshot
            finally:
                os.unlink(tmp)
        raise CommitConflict(f"lost {max_retries} consecutive commit races at {self.path}")

    # --------------------------------------------------------------- refs
    #
    # Iceberg-style named references over the snapshot log: a TAG is an
    # immutable pointer to one committed version (pin a training-data
    # snapshot forever — vacuum honors it); a BRANCH is an independent
    # lineage forked from a version (a dev/WAP line whose commits never
    # disturb main). Refs are metadata-only: creating either copies ZERO
    # data — a branch fork is one manifest-entry copy pointing at the
    # fork version's existing data directory.

    _REF_NAME_RE = r"[A-Za-z0-9][A-Za-z0-9._-]*"

    def _refs_dir(self) -> str:
        return os.path.join(self.path, "_refs")

    def _branches_dir(self) -> str:
        return os.path.join(self.path, "_branches")

    def _validate_ref_name(self, name: str) -> None:
        import re

        if not re.fullmatch(self._REF_NAME_RE, name):
            raise ValueError(f"invalid ref name: {name!r}")

    def _write_ref(self, name: str, entry: dict) -> None:
        """CAS-create ``_refs/<name>.json`` (atomic link, like commits):
        a ref name can be claimed exactly once — re-tagging requires an
        explicit :meth:`drop_ref` first, so a pinned snapshot can't be
        silently repointed."""
        os.makedirs(self._refs_dir(), exist_ok=True)
        token = uuid.uuid4().hex[:8]
        tmp = os.path.join(self._refs_dir(), f".{name}.{token}.tmp")
        with open(tmp, "w") as f:
            json.dump(entry, f)
        try:
            os.link(tmp, os.path.join(self._refs_dir(), f"{name}.json"))
        except FileExistsError:
            raise ValueError(f"ref {name!r} already exists at {self.path}") from None
        finally:
            os.unlink(tmp)

    def _read_ref(self, name: str) -> dict:
        p = os.path.join(self._refs_dir(), f"{name}.json")
        if not os.path.exists(p):
            raise ValueError(f"unknown ref {name!r} at {self.path}")
        return json.load(open(p))

    def refs(self) -> list[dict]:
        """All named refs, each with its current resolved version (a
        branch resolves to its own head, not its fork point)."""
        if not os.path.isdir(self._refs_dir()):
            return []
        out = []
        for f in sorted(os.listdir(self._refs_dir())):
            if not f.endswith(".json"):
                continue
            e = self._read_ref(f[:-5])
            if e["type"] == "branch":
                e = dict(e, version=self.branch(e["name"]).current_version())
            out.append(e)
        return out

    def drop_ref(self, name: str) -> None:
        """Delete a ref. A dropped tag's snapshot becomes eligible for
        expiry on the next :meth:`vacuum`; a dropped branch's commits
        become unreferenced (its staged dirs age out as orphans)."""
        e = self._read_ref(name)
        os.unlink(os.path.join(self._refs_dir(), f"{name}.json"))
        if e["type"] == "branch":
            shutil.rmtree(os.path.join(self._branches_dir(), name), ignore_errors=True)

    def tag(self, name: str, version: int | None = None) -> int:
        """Create an immutable tag at ``version`` (default: current).
        Tags are retention roots: :meth:`vacuum` keeps a tagged snapshot's
        manifest and data alive regardless of ``retain_last`` — the
        'audit-2024' / 'train-v3' reproducibility pin."""
        if self._ref_name is not None:
            raise ValueError("tags live on the main table, not a branch handle")
        self._validate_ref_name(name)
        v = self.current_version() if version is None else version
        if v not in self._versions():
            raise ValueError(f"version {v} not committed at {self.path}")
        self._write_ref(name, {"name": name, "type": "tag", "version": v})
        return v

    def _branch_handle(self, name: str) -> "VersionedTable":
        h = VersionedTable(
            self.spark,
            self.path,
            record_cdf=self._record_cdf,
            cdf_keys=self._cdf_keys or None,
        )
        h._manifest_dir = os.path.join(self._branches_dir(), name)
        h._ref_name = name
        return h

    def create_branch(self, name: str, version: int | None = None) -> "VersionedTable":
        """Fork an independent lineage at ``version`` (default: current)
        and return its table handle. The fork copies ONE manifest entry
        — the branch's base snapshot IS the fork version's data directory
        (zero data copied, exactly Iceberg's branch semantics). Branch
        commits version-number from the fork point in their own manifest
        namespace and never appear in main's history; main's writes never
        appear in the branch. Data staged by branch commits lives in the
        shared table directory, so main's :meth:`vacuum` treats branch
        manifests as GC roots."""
        if self._ref_name is not None:
            raise ValueError("branch from the main table, not another branch")
        self._validate_ref_name(name)
        v = self.current_version() if version is None else version
        if v not in self._versions():
            raise ValueError(f"version {v} not committed at {self.path}")
        bdir = os.path.join(self._branches_dir(), name)
        os.makedirs(bdir, exist_ok=True)
        # seed: the fork version's manifest verbatim (same data dir).
        # CHUNKED stats re-attach under the branch's own manifest dir —
        # a verbatim manifest_list would reference chunk files that live
        # (and expire) in MAIN's manifest dir, crashing branch planning.
        seed = dict(self._manifest(v), operation="branch_fork")
        if seed.get("manifest_list") is not None:
            files = self._file_stats_list(seed)
            seed.pop("manifest_list")
            self._attach_file_stats(
                seed, files, v, uuid.uuid4().hex[:8], manifest_dir=bdir
            )
        with open(os.path.join(bdir, f"v{v}.json"), "w") as f:
            json.dump(seed, f)
        try:
            self._write_ref(
                name, {"name": name, "type": "branch", "forked_at": v}
            )
        except ValueError:
            shutil.rmtree(bdir, ignore_errors=True)
            raise
        return self._branch_handle(name)

    def branch(self, name: str) -> "VersionedTable":
        """Open an existing branch's table handle (reads and writes apply
        to the branch lineage only)."""
        e = self._read_ref(name)
        if e["type"] != "branch":
            raise ValueError(f"ref {name!r} is a {e['type']}, not a branch")
        return self._branch_handle(name)

    def read_ref(self, name: str) -> DataFrame:
        """Read a ref: a tag resolves to its pinned snapshot, a branch to
        the branch head."""
        e = self._read_ref(name)
        if e["type"] == "tag":
            return self.read_version(e["version"])
        return self.branch(name).read()

    def publish_branch(self, name: str) -> int:
        """Iceberg fast-forward: commit the BRANCH head's snapshot onto
        main as a METADATA-ONLY operation — the new main manifest points
        at the branch head's existing data directory; zero rows are
        copied or rewritten, whatever the snapshot size. This completes
        the branch-based write-audit-publish loop: ingest commits land on
        an isolated branch, audits read the branch, and a passing audit
        publishes by pointer swap. The published commit's write set is
        unknown (None) — it conservatively conflicts with concurrent
        serializable merges, like overwrite."""
        if self._ref_name is not None:
            raise ValueError("publish_branch runs on the main table")
        bh = self.branch(name)
        v_branch = bh.current_version()
        src = bh._manifest(v_branch)
        for _ in range(5):
            parent = self.current_version()
            v = (parent or 0) + 1
            token = uuid.uuid4().hex[:8]
            entry = {
                "version": v,
                "operation": "publish",
                "parent": parent,
                "n_rows": src["n_rows"],
                "data_dir": src.get("data_dir", f"_v{v_branch}"),
                # incremental-append heads: publish the whole dir chain
                **(
                    {"base_dirs": src["base_dirs"]}
                    if src.get("base_dirs")
                    else {}
                ),
                # column-mapped heads: publish the logical schema too
                **(
                    {"column_renames": src["column_renames"]}
                    if src.get("column_renames")
                    else {}
                ),
                **(
                    {"column_drops": src["column_drops"]}
                    if src.get("column_drops")
                    else {}
                ),
                **(
                    {"checks": src["checks"]}
                    if src.get("checks")
                    else {}
                ),
                **(
                    {"generated": src["generated"]}
                    if src.get("generated")
                    else {}
                ),
                **(
                    {"identity": src["identity"]}
                    if src.get("identity")
                    else {}
                ),
                **(
                    {"hidden_partition": src["hidden_partition"]}
                    if src.get("hidden_partition")
                    else {}
                ),
                "dv_dirs": src.get("dv_dirs", []),
                "pos_dv_dirs": src.get("pos_dv_dirs", []),
                **({"file_granular": True} if src.get("file_granular") else {}),
                "dv_keys": src.get("dv_keys"),
                "partition_by": src.get("partition_by"),
                "cdf_dir": None,
                "committed_at": time.time(),
                "modified_keys": None,
                "published_from": {"branch": name, "version": v_branch},
                "txn": dict(self._txn_state(parent)),
            }
            os.makedirs(self._manifest_dir, exist_ok=True)
            # the branch head's file stats publish too (pruning survives
            # the pointer swap); chunked lists RE-ATTACH under main's
            # manifest dir with this commit's own version+token — sharing
            # the branch's chunk files (or a prior publish's) would let
            # one version's expiry unlink chunks another still references
            chunk_paths = self._attach_file_stats(
                entry, bh._file_stats_list(src), v, token
            )
            tmp = os.path.join(self._manifest_dir, f".v{v}.{token}.json.tmp")
            with open(tmp, "w") as f:
                json.dump(entry, f)
            try:
                if self._link_version_slot(
                    tmp, os.path.join(self._manifest_dir, f"v{v}.json"), v
                ):
                    return v
                for cp in chunk_paths:
                    try:
                        os.unlink(cp)
                    except FileNotFoundError:
                        pass
                continue  # racer took this version; fast-forward onto the winner
            finally:
                os.unlink(tmp)
        raise CommitConflict(f"lost 5 consecutive commit races at {self.path}")

    def restore(self, version: int) -> int:
        """Delta ``RESTORE TABLE ... VERSION AS OF`` — roll the table
        BACK by rolling FORWARD: commit a new version whose content is the
        old snapshot, so the bad interval stays in history (auditable,
        time-travelable) and concurrent readers never see a version
        disappear. O(snapshot) rewrite, like Delta's restore.

        No write-time change feed is recorded for the restore commit (its
        delta is a whole-snapshot diff, not a row edit); a ``record_cdf``
        table's :meth:`changes_feed` across it raises and the caller falls
        back to :meth:`changes`, which handles exactly this case."""
        if version not in self._versions():
            raise ValueError(f"version {version} not committed at {self.path}")
        snap = self.read_version(version)
        # restore restores the LAYOUT too: the new snapshot is written
        # with the restored version's partitioning (hive or hidden), not
        # flattened — Delta's RESTORE keeps table layout the same way
        e = self._manifest(version)
        return self._commit_with_retry(
            lambda cur: snap, "restore",
            partition_by=e.get("partition_by"),
            hidden_partition=e.get("hidden_partition"),
        )

    # -------------------------------------------------------- maintenance

    def vacuum(
        self,
        retain_last: int | None = None,
        orphan_retention_s: float = 24 * 3600,
    ) -> list[str]:
        """Garbage-collect data directories no committed manifest points
        at — the residue of crashes mid-stage and lost commit races.
        With ``retain_last=N``, additionally expires snapshots older than
        the newest N (their manifests AND data), Delta's
        ``VACUUM``/log-retention combined. Never touches the current
        version. Returns the removed directory names.

        An *unreferenced* directory younger than ``orphan_retention_s``
        is skipped (mtime-based, Delta-style): it may be a concurrent
        writer's fully-staged snapshot whose manifest hard-link hasn't
        landed yet — deleting it would let that writer's CAS succeed and
        commit a version whose data is gone. Directories referenced by an
        *expired* manifest are committed history and removed regardless
        of age. Pass ``orphan_retention_s=0`` only when no concurrent
        writers exist (tests, single-writer maintenance windows).

        Refs are retention roots: a TAGGED version's manifest and data
        survive ``retain_last`` (drop the tag to let it expire), and
        every directory referenced by a BRANCH manifest (including the
        shared fork-point data) stays live."""
        if self._ref_name is not None:
            raise ValueError("vacuum runs on the main table, not a branch handle")
        versions = self._versions()
        keep = set(versions if retain_last is None else versions[-retain_last:])
        for ref in self.refs():  # tags pin their snapshot
            if ref["type"] == "tag":
                keep.add(ref["version"])
        keep_versions = [v for v in versions if v in keep]
        live_dirs = set()
        expired_dirs = set()
        for v in versions:
            entry = self._manifest(v)
            dirs = {
                entry.get("data_dir", f"_v{v}"),
                *entry.get("base_dirs", []),
                *entry.get("dv_dirs", []),
                *entry.get("pos_dv_dirs", []),
            }
            if entry.get("cdf_dir"):
                dirs.add(entry["cdf_dir"])
            (live_dirs if v in keep_versions else expired_dirs).update(dirs)
        if os.path.isdir(self._branches_dir()):
            for b in os.listdir(self._branches_dir()):
                bh = self._branch_handle(b)
                for v in bh._versions():
                    e = bh._manifest(v)
                    live_dirs.add(e.get("data_dir", f"_v{v}"))
                    live_dirs.update(e.get("base_dirs", []))
                    live_dirs.update(e.get("dv_dirs", []))
                    live_dirs.update(e.get("pos_dv_dirs", []))
                    if e.get("cdf_dir"):
                        live_dirs.add(e["cdf_dir"])
        expired_dirs -= live_dirs  # a dir shared with a live version stays
        now = time.time()
        removed = []
        for d in sorted(os.listdir(self.path)):
            full = os.path.join(self.path, d)
            if not (d.startswith(("_v", "_dv", "_cdf")) and os.path.isdir(full)) or d in live_dirs:
                continue
            if d not in expired_dirs:
                try:
                    age = now - os.path.getmtime(full)
                except OSError:
                    continue  # raced with its writer's cleanup
                if age < orphan_retention_s:
                    continue
            shutil.rmtree(full, ignore_errors=True)
            removed.append(d)
        for v in versions:
            if v not in keep_versions:
                # chunked file-stats manifests expire with their version
                for c in self._manifest(v).get("manifest_list") or []:
                    try:
                        os.unlink(os.path.join(self._manifest_dir, c["path"]))
                    except FileNotFoundError:
                        pass
                # bloom sidecars (head + chunk files) expire too — they are
                # version-keyed and useless once the manifest is gone; the
                # "bloom-v{N}." prefix cannot collide across versions
                # ("bloom-v1." never prefixes "bloom-v10.json")
                for f in os.listdir(self._manifest_dir):
                    if f == f"bloom-v{v}.json" or f.startswith(f"bloom-v{v}."):
                        try:
                            os.unlink(os.path.join(self._manifest_dir, f))
                        except FileNotFoundError:
                            pass
                os.unlink(os.path.join(self._manifest_dir, f"v{v}.json"))
        # refresh the log checkpoint (vacuum may have expired the manifest
        # the old checkpoint pointed at — a stale one only degrades to the
        # listing fallback, but maintenance should leave it fresh)
        if versions:
            self.checkpoint_log()
        return removed

    # -------------------------------------------------------------- reads

    def read(self) -> DataFrame | None:
        v = self.current_version()
        return None if v is None else self.read_version(v)

    def stats_agg(self, col: str, version: int | None = None) -> dict | None:
        """O(1) metadata aggregate — MIN/MAX/COUNT of ``col`` answered
        from the manifest's per-file stats, no scan, no footer reads (the
        Delta/Iceberg metadata-only-query optimization: at 100 TB these
        three aggregates are free). Returns ``{"min", "max", "n_rows"}``,
        or None when any file lacks usable stats for the column (caller
        falls back to a scan). NULL-count caveat: parquet min/max ignore
        NULLs, matching SQL MIN/MAX semantics; n_rows counts all rows."""
        v = self.current_version() if version is None else version
        if v is None:
            return None
        entry = self._manifest(v)
        if self._is_mor(entry):
            # merge-on-read version: file stats still count tombstoned
            # rows — MIN/MAX/COUNT from them would be wrong
            return None
        phys = self._physical_name(entry, col)  # stats carry physical names
        ml = entry.get("manifest_list")
        if ml is not None:
            # chunked manifests: descriptors already fold member bounds,
            # so the aggregate reads O(chunks) descriptors, ZERO chunks
            bs = [c.get("stats", {}).get(phys) for c in ml]
            if any(b is None for b in bs):
                return None  # some chunk has a file without usable stats
            return {
                "min": min(b[0] for b in bs),
                "max": max(b[1] for b in bs),
                "n_rows": entry["n_rows"],
            }
        files = entry.get("files")
        if not files:
            return None
        los, his = [], []
        for f in files:
            lo, hi = f["stats"].get(phys, [None, None])
            if lo is None or hi is None:
                return None
            los.append(lo)
            his.append(hi)
        return {"min": min(los), "max": max(his), "n_rows": entry["n_rows"]}

    def read_pruned(
        self, col: str, lo, hi, version: int | None = None
    ) -> tuple[DataFrame, int, int]:
        """Range scan ``col BETWEEN lo AND hi`` planned from the MANIFEST's
        per-file min/max — Iceberg-style scan planning: the driver never
        lists the data directory and never opens a footer; it reads one
        already-loaded JSON entry and hands Spark the exact file list
        whose [min, max] overlaps the predicate. Returns
        (df, n_files_read, n_files_total).

        At 100 TB this is the difference between O(files) object-store
        LIST/HEAD calls at plan time and O(1) manifest reads; the
        residual filter still applies inside surviving files (file grain
        is coarser than row grain), and a file with no usable stats is
        conservatively kept. Pruning effectiveness comes from layout:
        write the snapshot range-clustered on ``col`` (each file covers a
        narrow slice) — a random layout keeps every file."""
        from pyspark.sql import functions as F

        v = self.current_version() if version is None else version
        if v is None:
            raise ValueError(f"cannot scan empty table {self.path}")
        entry = self._manifest(v)
        data_dir = os.path.join(self.path, entry["data_dir"])
        # ``col`` is LOGICAL; files and their stats carry PHYSICAL names
        phys = self._physical_name(entry, col)
        rng = lambda c: (F.col(c) >= F.lit(lo)) & (F.col(c) <= F.lit(hi))  # noqa: E731
        has_stats = (
            entry.get("files") is not None
            or entry.get("manifest_list") is not None
        )
        if self._is_mor(entry) or not has_stats:
            # Stats omitted (huge commit / legacy manifest), or a
            # merge-on-read version (dv_dirs): the file list alone would
            # RESURRECT tombstoned rows, so route through read_version,
            # which applies the anti-join. (delete_mor manifests never
            # carry `files`; the dv_dirs guard makes that explicit.)
            df = self.read_version(v).filter(rng(col))
            return df, -1, -1
        nlo, nhi = _stats_norm(lo), _stats_norm(hi)

        def file_keep(f):
            fmin, fmax = f["stats"].get(phys, [None, None])
            return fmin is None or fmax is None or not (fmax < nlo or fmin > nhi)

        kept, n_files = self._planned_files(
            entry, phys, file_keep, lambda clo, chi: not (chi < nlo or clo > nhi)
        )
        # table-root-relative: incremental-append entries carry their
        # owning dir, single-dir entries default to data_dir
        keep = [
            os.path.join(f.get("dir", entry["data_dir"]), f["path"]) for f in kept
        ]
        if not keep:  # predicate outside the table's range: 0 files read
            empty = self.read_version(v).filter(F.lit(False))
            return empty, 0, n_files
        reader = self.spark.read
        if entry.get("partition_by") and not entry.get("hidden_partition"):
            # explicit file list under a hive layout: basePath keeps the
            # partition columns in the schema. HIDDEN layouts skip it: the
            # derived column is dropped from the logical schema anyway,
            # and a chained (AddFile) snapshot's files span several dirs —
            # no single basePath is an ancestor of all of them
            reader = reader.option("basePath", data_dir)
        df = reader.parquet(*[os.path.join(self.path, p) for p in keep]).filter(
            rng(phys)
        )
        return self._apply_column_mapping(df, entry), len(keep), n_files

    def read_pruned_in(
        self, col: str, values: list, version: int | None = None
    ) -> tuple[DataFrame, int, int]:
        """Point/IN-list scan planned from manifest stats: keep only the
        files whose [min, max] contains at least one of ``values`` — the
        key/id-lookup companion of :meth:`read_pruned` (zone maps answer
        IN the same way they answer BETWEEN: membership in the range is
        necessary for membership in the file). Residual ``isin`` filter
        applies inside surviving files. Returns (df, n_read, n_total)."""
        from pyspark.sql import functions as F

        v = self.current_version() if version is None else version
        if v is None:
            raise ValueError(f"cannot scan empty table {self.path}")
        entry = self._manifest(v)
        # dv guard: see read_pruned — a merge-on-read version's file list
        # would resurrect tombstoned rows
        has_stats = (
            entry.get("files") is not None
            or entry.get("manifest_list") is not None
        )
        if self._is_mor(entry) or not has_stats:
            df = self.read_version(v).filter(F.col(col).isin(values))
            return df, -1, -1
        phys = self._physical_name(entry, col)  # stats/blooms are physical
        nvals = [_stats_norm(x) for x in values]

        def file_keep(f):
            fmin, fmax = f["stats"].get(phys, [None, None])
            return (
                fmin is None
                or fmax is None
                or any(x is not None and fmin <= x <= fmax for x in nvals)
            )

        kept, n_files = self._planned_files(
            entry,
            phys,
            file_keep,
            lambda clo, chi: any(
                x is not None and clo <= x <= chi for x in nvals
            ),
        )
        # table-root-relative (see read_pruned) — also the bloom
        # sidecar's key form
        keep = [
            os.path.join(f.get("dir", entry["data_dir"]), f["path"]) for f in kept
        ]
        # Bloom sidecar refinement (build_bloom_index): zone maps are the
        # first line of pruning; when the snapshot carries a per-file
        # bloom for this column, test every zone-surviving file against
        # the probes' JVM-computed hashes and drop definite misses. A
        # file ABSENT from a built sidecar had zero non-NULL values (the
        # build enumerates the whole snapshot dir), so it cannot match an
        # equality probe. No false negatives: bloom_test mirrors the
        # build's position math bit-for-bit.
        blooms = self._bloom_sidecar(v) if keep else None
        if blooms and (
            phys in blooms.get("cols", {}) or phys in blooms.get("chunks", {})
        ):
            from ..operators.bloom import bloom_test

            hs = self._hash_probe_values(values, blooms["dtypes"][phys])
            bm, bk = blooms["m_bits"], blooms["k"]
            per_file = self._bloom_words_for(blooms, phys, keep)
            keep = [
                p
                for p in keep
                if (w := per_file.get(p)) is not None
                and any(bloom_test(w, h, bm, bk) for h in hs)
            ]
        if not keep:
            empty = self.read_version(v).filter(F.lit(False))
            return empty, 0, n_files
        reader = self.spark.read
        if entry.get("partition_by") and not entry.get("hidden_partition"):
            # see read_pruned: hidden layouts drop the derived column and
            # may chain dirs — basePath would mis-root the explicit list
            reader = reader.option(
                "basePath", os.path.join(self.path, entry["data_dir"])
            )
        df = reader.parquet(*[os.path.join(self.path, p) for p in keep]).filter(
            F.col(phys).isin(values)
        )
        return self._apply_column_mapping(df, entry), len(keep), n_files

    def _hidden_parts(self, entry: dict) -> tuple[dict, dict[str, list[str]]]:
        """(spec, {chained dir → its hive subdirectories}). Incremental
        AddFile appends give a hidden-partitioned snapshot a base_dirs
        CHAIN — each dir carries its own hive layout for the same spec,
        so planning lists and prunes PER DIRECTORY (before r10 any chain
        fell back to an unpruned full read)."""
        spec = entry.get("hidden_partition")
        if not spec:
            raise ValueError(
                f"{self.path} snapshot has no hidden partitioning"
            )
        prefix = spec["name"] + "="
        dirs = [*entry.get("base_dirs", []), entry["data_dir"]]
        return spec, {
            d: [
                s
                for s in os.listdir(os.path.join(self.path, d))
                if s.startswith(prefix)
            ]
            for d in dirs
        }

    @staticmethod
    def _hidden_dir_value(d: str) -> int | None:
        """Partition-dir name → its integer transform value, or None for
        the NULL partition: a NULL source value writes a
        ``__HIVE_DEFAULT_PARTITION__`` directory, whose rows can never
        match a range/IN residual on the source column — safe (and
        required) to exclude rather than crash planning with ValueError."""
        raw = d.split("=", 1)[1]
        try:
            return int(raw)
        except ValueError:
            return None

    def _read_hidden_parts(
        self,
        entry: dict,
        spec: dict,
        keep_by_dir: dict[str, list[str]],
        n_total: int,
        residual,
    ):
        from functools import reduce

        from pyspark.sql import functions as F

        n_keep = sum(len(v) for v in keep_by_dir.values())
        if n_keep == 0:
            empty = self.read_version(entry["version"]).filter(F.lit(False))
            return empty, 0, n_total
        parts = []
        for d, subs in keep_by_dir.items():
            if not subs:
                continue
            base = os.path.join(self.path, d)
            # basePath PER chained dir: each dir is its own hive root
            parts.append(
                self.spark.read.option("basePath", base).parquet(
                    *[os.path.join(base, s) for s in subs]
                )
            )
        df = (
            reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), parts)
            .filter(residual)
            .drop(spec["name"])
        )
        df = self._apply_column_mapping(df, entry)
        dv_dirs = entry.get("dv_dirs", [])
        if dv_dirs:
            # merge-on-read tombstones compose WITH pruning: the anti-join
            # applies on the pruned directory subset (tombstones for rows
            # in skipped partitions can't match anything there — they
            # reference rows the scan never reads). Before this, a table
            # with pending tombstones silently fell back to an unpruned
            # read_version scan (-1/-1), losing hidden-partition pruning
            # until compaction.
            dv = self.spark.read.parquet(
                *[os.path.join(self.path, d) for d in dv_dirs]
            ).distinct()
            df = df.join(dv, on=entry["dv_keys"], how="left_anti")
        return df, n_keep, n_total

    def read_hidden(
        self, lo, hi, version: int | None = None
    ) -> tuple[DataFrame, int, int]:
        """Hidden-partition RANGE scan: the caller filters on the SOURCE
        column; planning maps [lo, hi] through the snapshot's declared
        transform into partition-value bounds (pure Python date math, no
        Spark job) and opens only the matching hive directories —
        metadata-only pruning the user cannot get wrong, because the
        partition column never appears in their query. Returns
        ``(df, n_partitions_read, n_partitions_total)``; the residual
        source-column filter rides into the parquet scan."""
        v = self.current_version() if version is None else version
        if v is None:
            raise ValueError(f"cannot scan empty table {self.path}")
        from pyspark.sql import functions as F

        entry = self._manifest(v)
        spec, by_dir = self._hidden_parts(entry)
        residual = F.col(spec["source"]).between(F.lit(lo), F.lit(hi))
        if entry.get("pos_dv_dirs"):
            # position tombstones resolve by (file, row_index) identity —
            # the anti-join needs the _metadata lane; full-read fallback
            return self.read_version(v).filter(residual), -1, -1
        t = spec["transform"]
        plo = _hidden_partition_literal(t, lo)
        phi = _hidden_partition_literal(t, hi)
        keep = {
            d: [
                s
                for s in subs
                if (pv := self._hidden_dir_value(s)) is not None
                and plo <= pv <= phi
            ]
            for d, subs in by_dir.items()
        }
        n_total = sum(len(v2) for v2 in by_dir.values())
        return self._read_hidden_parts(entry, spec, keep, n_total, residual)

    def read_hidden_in(
        self, values: list, version: int | None = None
    ) -> tuple[DataFrame, int, int]:
        """Hidden-partition POINT/IN-list scan — the ``bucket:N``
        transform's probe path: each probe value is hashed exactly the
        way the write hashed it (one tiny Spark job on a literal
        relation, so the xxhash64 input type matches bit-for-bit), and
        only the hive directories holding those buckets open."""
        v = self.current_version() if version is None else version
        if v is None:
            raise ValueError(f"cannot scan empty table {self.path}")
        from pyspark.sql import functions as F

        entry = self._manifest(v)
        spec, by_dir = self._hidden_parts(entry)
        residual = F.col(spec["source"]).isin(values)
        if entry.get("pos_dv_dirs"):
            # see read_hidden: position tombstones need the _metadata lane
            return self.read_version(v).filter(residual), -1, -1
        t = spec["transform"]
        if t.startswith("bucket:"):
            n = int(t.split(":")[1])
            dtype = dict(self.read_version(v).dtypes)[spec["source"]]
            wanted = {
                ((h % n) + n) % n
                for h in self._hash_probe_values(values, dtype)
            }
        else:
            wanted = {_hidden_partition_literal(t, x) for x in values}
        keep = {
            d: [s for s in subs if self._hidden_dir_value(s) in wanted]
            for d, subs in by_dir.items()
        }
        n_total = sum(len(v2) for v2 in by_dir.values())
        return self._read_hidden_parts(entry, spec, keep, n_total, residual)

    def _bloom_sidecar_path(self, version: int) -> str:
        # MUST NOT match _versions()'s `v*.json` manifest glob
        return os.path.join(self._manifest_dir, f"bloom-v{version}.json")

    def build_bloom_index(
        self,
        cols: list[str],
        m_bits: int | None = None,
        k: int = 7,
        version: int | None = None,
        chunk_files: int = 1000,
    ) -> dict:
        """Per-file Bloom-filter index for point-lookup file skipping —
        the Hudi bloom-index / Delta ``CREATE BLOOMFILTER INDEX`` idea.
        Zone maps (per-file min/max) prune point lookups only when the
        layout is clustered on the probe column; a high-cardinality key
        spread uniformly across files gives every file ≈ the global
        [min, max] and zone maps keep everything. A ~m_bits-bit bloom
        per file answers "could this file contain value v?" regardless
        of layout.

        Build is ONE distributed column-pruned scan per call (all
        ``cols`` together): xxhash64 → k positions → two-phase
        ``groupBy(file, word).bit_or`` (operators/bloom.py::
        bloom_words_by_file_df). The committed manifest itself is never
        mutated.

        The sidecar plane is CHUNKED above ``chunk_files`` files, like
        the r9 chunked stats manifests: per-file word arrays stream to
        per-column CHUNK files (``bloom-v{N}.c{ci}.{i}.json``, ≤
        ``chunk_files`` files each, key-range-descriptored from the
        ``bloom-v{N}.json`` head) via ``toLocalIterator`` over a
        file-sorted aggregate — the driver holds ONE chunk at a time,
        never the table's whole word matrix (the old monolithic build
        collected every per-file array: ~2 KB/file ⇒ ~2 GB of driver
        JSON at 10^6 files, a plan-time scale-killer — r9 VERDICT item
        3). Probes load only the chunks whose key range covers a
        zone-surviving file. At or below ``chunk_files`` files the
        sidecar stays a single JSON (same shape as always). Both
        layouts are deterministic tmp+rename — idempotent, concurrent
        builders converge. At 100 TB: build cost is a single scan of
        the indexed columns; probe cost is O(zone-surviving chunks)
        JSON loads + driver bit math, flat in table file count.

        Raises on merge-on-read versions (file grain lies under
        deletion vectors) and when the manifest carries no per-file
        stats (huge-commit fallback)."""
        from pyspark.sql import functions as F

        from ..operators.bloom import bloom_words_by_file_df

        v = self.current_version() if version is None else version
        if v is None:
            raise ValueError(f"cannot index empty table {self.path}")
        entry = self._manifest(v)
        if self._is_mor(entry):
            raise ValueError(
                "bloom index on a merge-on-read version would describe "
                "tombstoned rows; compact first"
            )
        entry_files = self._file_stats_list(entry)  # resolves chunking
        if entry_files is None:
            raise ValueError(
                "manifest carries no per-file stats; bloom sidecar "
                "requires the per-file manifest"
            )
        if m_bits is None:
            # Size for the BIGGEST file at ~10 bits per row (with k=7
            # that's ≈0.8% false positives — the classic m/n=10 point;
            # Hudi's index defaults to the same order). Known from the
            # manifest for free; rounded up to a power of two, capped at
            # 2^24 bits = 2 MiB of words per file per column so a
            # mis-sized call can't explode the sidecar.
            mx = max((f["n_rows"] for f in entry_files), default=1)
            m_bits = 1024
            while m_bits < 10 * mx and m_bits < (1 << 24):
                m_bits <<= 1
        reader = self.spark.read
        if entry.get("partition_by") and not entry.get("hidden_partition"):
            reader = reader.option(
                "basePath", os.path.join(self.path, entry["data_dir"])
            )
        if entry.get("file_granular"):
            # optimize snapshots: scan the EXPLICIT file list (the dirs
            # also hold superseded originals whose words would poison the
            # index — r10 turns the old compact-first guard into this)
            d_dir = entry["data_dir"]
            df = reader.parquet(
                *[
                    os.path.join(self.path, f.get("dir", d_dir), f["path"])
                    for f in entry_files
                ]
            )
        elif entry.get("hidden_partition") and entry.get("base_dirs"):
            # chained hidden layouts: per-dir reads (multi-root hive reads
            # trip CONFLICTING_DIRECTORY_STRUCTURES — see read_version)
            from functools import reduce as _reduce

            df = _reduce(
                lambda a, b: a.unionByName(b, allowMissingColumns=True),
                [
                    self.spark.read.parquet(os.path.join(self.path, d))
                    for d in [*entry["base_dirs"], entry["data_dir"]]
                ],
            )
        else:
            dirs = [*entry.get("base_dirs", []), entry["data_dir"]]
            df = reader.parquet(*[os.path.join(self.path, d) for d in dirs])
        df = df.withColumn("__file", F.input_file_name())
        # sidecar lives in the PHYSICAL-name domain, like the file stats
        cols = [self._physical_name(entry, c) for c in cols]
        dtypes = dict(df.dtypes)
        missing = [c for c in cols if c not in dtypes]
        if missing:
            raise ValueError(f"no such columns: {missing}")

        from urllib.parse import unquote, urlparse

        def _rel(uri: str) -> str:
            # table-root-relative ("<dir>/<file>") — the same key form
            # read_pruned_in's keep list uses, incremental or not; files a
            # SHALLOW CLONE references in its source table live outside
            # this root, where the keep key is the absolute path instead
            p = unquote(urlparse(uri).path)
            r = os.path.relpath(p, self.path)
            return p if r.startswith("..") else r

        n_words = m_bits // 64
        # canonical chunk boundaries come from the MANIFEST's file list
        # (identical for every column — a column all-NULL in some file
        # must not shift another column's chunk ranges): sorted keys,
        # sliced into ranges of ≤ chunk_files
        data_dir_name = entry["data_dir"]
        canon = sorted(
            os.path.join(f.get("dir", data_dir_name), f["path"])
            for f in entry_files
        )
        chunked = len(canon) > chunk_files
        ranges = [
            (canon[i], canon[min(i + chunk_files, len(canon)) - 1])
            for i in range(0, len(canon), chunk_files)
        ]
        chunk_of = {
            key: i
            for i, lo in enumerate(range(0, len(canon), chunk_files))
            for key in canon[lo : lo + chunk_files]
        }

        def _iter_col(c):
            """(key, dense words) per file holding ≥1 non-NULL value of
            ``c`` — streamed partition-by-partition (toLocalIterator), so
            the driver never materializes the full word matrix."""
            g = (
                bloom_words_by_file_df(df, c, m_bits=m_bits, k=k)
                .groupBy("file")
                .agg(F.sort_array(F.collect_list(F.struct("w", "word"))).alias("ww"))
                .orderBy("file")
            )
            for r in g.toLocalIterator():
                words = [0] * n_words
                for e in r["ww"]:
                    words[e["w"]] = e["word"]
                yield _rel(r["file"]), words

        def _write_json(path: str, obj) -> None:
            tmp = path + f".{uuid.uuid4().hex[:8]}.tmp"
            with open(tmp, "w") as f:
                json.dump(obj, f)
            os.replace(tmp, path)  # deterministic content → converging CAS

        head: dict = {
            "version": v,
            "m_bits": m_bits,
            "k": k,
            "dtypes": {c: dtypes[c] for c in cols},
        }
        if not chunked:
            head["cols"] = {c: dict(_iter_col(c)) for c in cols}
            _write_json(self._bloom_sidecar_path(v), head)
            return head
        head["chunks"] = {}
        for ci, c in enumerate(cols):
            descs = [
                {"path": f"bloom-v{v}.c{ci}.{i}.json", "lo": lo, "hi": hi, "n": 0}
                for i, (lo, hi) in enumerate(ranges)
            ]
            bufs: dict[int, dict] = {}
            for key, words in _iter_col(c):
                i = chunk_of.get(key)
                if i is None:
                    # a file outside the manifest list (shouldn't happen —
                    # the scan reads exactly the manifest dirs) would make
                    # probes silently miss it; fail the build instead
                    raise RuntimeError(
                        f"bloom build saw file {key} absent from the "
                        f"manifest's file list at {self.path}"
                    )
                buf = bufs.setdefault(i, {})
                buf[key] = words
                # sorted streaming completes chunks in order: flush as
                # soon as a chunk has every file it can have (files
                # all-NULL in this column never arrive — flushed at end)
                if len(buf) == min(chunk_files, len(canon) - i * chunk_files):
                    descs[i]["n"] = len(buf)
                    _write_json(
                        os.path.join(self._manifest_dir, descs[i]["path"]),
                        bufs.pop(i),
                    )
            for i, buf in bufs.items():
                descs[i]["n"] = len(buf)
                _write_json(
                    os.path.join(self._manifest_dir, descs[i]["path"]), buf
                )
            head["chunks"][c] = descs
        _write_json(self._bloom_sidecar_path(v), head)
        return head

    def _bloom_sidecar(self, version: int) -> dict | None:
        p = self._bloom_sidecar_path(version)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def _bloom_words_for(
        self, head: dict, col: str, keys: list[str]
    ) -> dict:
        """Per-file bloom words for exactly the requested file keys.
        Monolithic heads answer from the in-head dict; CHUNKED heads load
        only the chunk files whose [lo, hi] key range covers a requested
        key — plan-time I/O is O(zone-surviving chunks), flat in table
        file count (the r9 stats-chunk property, applied to blooms). A
        key absent from every chunk had zero non-NULL values (skip); a
        descriptor with no written file means its whole slice was
        all-NULL (same skip)."""
        if "cols" in head:
            return head["cols"].get(col, {})
        import bisect

        descs = head.get("chunks", {}).get(col, [])
        los = [d["lo"] for d in descs]  # sorted, non-overlapping ranges
        needed = set()
        for key in keys:
            i = bisect.bisect_right(los, key) - 1
            if i >= 0 and key <= descs[i]["hi"]:
                needed.add(i)
        out: dict = {}
        want = set(keys)
        for i in sorted(needed):
            p = os.path.join(self._manifest_dir, descs[i]["path"])
            try:
                with open(p) as f:
                    chunk = json.load(f)
            except FileNotFoundError:
                continue  # all-NULL slice: never written — nothing can match
            out.update((k, w) for k, w in chunk.items() if k in want)
        return out

    def _hash_probe_values(self, values: list, dtype: str) -> list[int]:
        """xxhash64 of each probe value, computed BY SPARK on a one-row-
        per-value local relation with the indexed column's exact type —
        the only way to guarantee bit-identical hashes with the build
        scan (xxhash64 output depends on the input's Spark type)."""
        from pyspark.sql import functions as F

        rows = (
            self.spark.createDataFrame(
                [(x,) for x in values], schema=f"v {dtype}"
            )
            .select(F.xxhash64("v").alias("h"))
            .collect()
        )
        return [r["h"] for r in rows]

    def changes(
        self, v_from: int, v_to: int, keys: list[str], verify_keys: bool = True
    ) -> DataFrame:
        """Change data feed between two committed snapshots (the Delta
        CDF analogue): classify every key as insert / delete /
        update_preimage+update_postimage by a single full-outer join of
        the two versions on ``keys`` with null-safe column comparison.

        Emits the version-`v_to`-side row for inserts/postimages and the
        version-`v_from`-side row for deletes/preimages, plus
        ``_change_type`` — the contract downstream incremental consumers
        (streaming upserts, mart refresh) read instead of re-diffing
        snapshots. Cost is one key-partitioned join regardless of how
        many commits separate the versions.

        Requires (and verifies) that ``keys`` is unique within EACH
        snapshot — duplicate keys would turn the full-outer join into a
        per-key cross product silently misclassified as updates — and that
        both snapshots share one schema (schema evolution between the two
        versions must be resolved by the caller, e.g. via
        ``sources.evolution`` before diffing)."""
        from functools import reduce

        from pyspark.sql import functions as F

        pre_raw = self.read_version(v_from)
        post_raw = self.read_version(v_to)
        if set(pre_raw.columns) != set(post_raw.columns):
            drift = set(pre_raw.columns) ^ set(post_raw.columns)
            raise ValueError(
                f"changes(v{v_from}→v{v_to}): snapshot schemas differ on "
                f"{sorted(drift)}; align schemas (schema evolution) before "
                "computing a change feed"
            )
        pre = pre_raw.withColumn("__pa", F.lit(True))
        post = post_raw.withColumn("__pb", F.lit(True))
        if verify_keys:
            # one job for both sides: a (side, key) group with >1 row means
            # duplicate keys in that snapshot. Writers that maintain the
            # key-unique invariant themselves (e.g. every commit goes
            # through merge() on the same keys) may pass verify_keys=False
            # to skip this key-projected scan.
            dup = (
                pre_raw.select(F.lit(f"v{v_from}").alias("__side"), *keys)
                .unionByName(post_raw.select(F.lit(f"v{v_to}").alias("__side"), *keys))
                .groupBy("__side", *keys)
                .agg(F.count(F.lit(1)).alias("__n"))
                .filter(F.col("__n") > 1)
                .limit(1)
                .collect()
            )
            if dup:
                raise ValueError(
                    f"changes(): join keys {keys} are not unique in snapshot "
                    f"{dup[0]['__side']}; a change feed requires one row per key"
                )
        cols = [c for c in pre.columns if c not in keys and c != "__pa"]
        a = pre.alias("a")
        b = post.alias("b")
        cond = reduce(
            lambda x, y: x & y, [F.col(f"a.{k}").eqNullSafe(F.col(f"b.{k}")) for k in keys]
        )
        j = a.join(b, cond, "full_outer")
        # presence markers, not key-null checks: a legitimately NULL key
        # (matched null-safely) must still classify correctly
        in_a = F.col("a.__pa").isNotNull()
        in_b = F.col("b.__pb").isNotNull()
        same = ~self._any_col_differs("a", "b", cols)

        def side(prefix: str, ctype: str) -> DataFrame:
            return j.select(
                *[F.col(f"{prefix}.{k}").alias(k) for k in keys],
                *[F.col(f"{prefix}.{c}").alias(c) for c in cols],
                F.lit(ctype).alias("_change_type"),
                in_a.alias("__in_a"),
                in_b.alias("__in_b"),
                same.alias("__same"),
            )

        inserts = side("b", "insert").filter(~F.col("__in_a") & F.col("__in_b"))
        deletes = side("a", "delete").filter(F.col("__in_a") & ~F.col("__in_b"))
        both = F.col("__in_a") & F.col("__in_b") & ~F.col("__same")
        pre_img = side("a", "update_preimage").filter(both)
        post_img = side("b", "update_postimage").filter(both)
        out = inserts.unionByName(deletes).unionByName(pre_img).unionByName(post_img)
        return out.drop("__in_a", "__in_b", "__same")

    def changes_feed(self, v_from: int, v_to: int) -> DataFrame:
        """Change data feed from WRITE-TIME recorded deltas (requires
        ``record_cdf=True`` on every commit in the range): reads the
        per-version delta files for versions (v_from, v_to] and COMPOSES
        them into the net change set — cost O(|changes|), never touching
        a snapshot. Semantics match :meth:`changes` (net diff): a key
        inserted then deleted inside the range nets to nothing; chained
        updates net to one preimage (the earliest) + one postimage (the
        latest); an update whose final value equals the initial one nets
        to nothing.

        Composition rule per key: the EARLIEST event determines the
        before-state (update_preimage/delete carry it; insert means
        absent), the LATEST determines the after-state (insert/
        update_postimage carry it; delete means absent); preimages order
        before postimages within a version."""
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        keys = self._cdf_keys
        if not keys:
            raise ValueError("changes_feed requires record_cdf=True + cdf_keys")
        parts = []
        for v in range(v_from + 1, v_to + 1):
            entry = self._manifest(v)
            cdf_dir = entry.get("cdf_dir")
            if cdf_dir is None:
                if entry.get("operation") in (
                    "add_check",
                    "drop_check",
                    "drop_generated",  # metadata-only: generation stops
                    "clone",
                    "optimize",  # row-IDENTICAL by construction (layout only)
                ):
                    # metadata-only / row-preserving commit: zero row
                    # changes by construction — contributes nothing
                    continue
                raise ValueError(
                    f"version {v} ({entry['operation']}) has no recorded "
                    f"change feed at {self.path} — use changes() (snapshot diff)"
                )
            parts.append(
                self.spark.read.parquet(os.path.join(self.path, cdf_dir))
                .withColumn("_v", F.lit(v))
            )
        if not parts:
            if v_from >= v_to:
                raise ValueError("empty version range")
            # a valid range whose commits were ALL metadata-only: a
            # correct feed with zero net changes, not an error
            from pyspark.sql import functions as F2

            return (
                self.read_version(v_to)
                .withColumn("_change_type", F2.lit(""))
                .limit(0)
            )
        deltas = parts[0]
        for p in parts[1:]:
            # allowMissingColumns: feeds recorded before a schema
            # evolution lack the newer columns — they read as null
            deltas = deltas.unionByName(p, allowMissingColumns=True)
        # preimages/deletes rank before postimages/inserts within a version
        rank = F.when(
            F.col("_change_type").isin("update_preimage", "delete"), F.lit(0)
        ).otherwise(F.lit(1))
        d = deltas.withColumn("_rank", rank)
        w_first = Window.partitionBy(*keys).orderBy(F.asc("_v"), F.asc("_rank"))
        w_last = Window.partitionBy(*keys).orderBy(F.desc("_v"), F.desc("_rank"))
        first = (
            d.withColumn("_rn", F.row_number().over(w_first))
            .filter(F.col("_rn") == 1).drop("_rn", "_v", "_rank")
        )
        last = (
            d.withColumn("_rn", F.row_number().over(w_last))
            .filter(F.col("_rn") == 1).drop("_rn", "_v", "_rank")
        )
        val_cols = [c for c in first.columns if c not in (*keys, "_change_type")]
        f, l = first.alias("f"), last.alias("l")
        j = f.join(l, on=keys, how="inner")  # same key set by construction
        before = F.col("f._change_type").isin("update_preimage", "delete")
        after = F.col("l._change_type").isin("insert", "update_postimage")

        inserts = j.filter(~before & after)
        deletes = j.filter(before & ~after)
        updated = j.filter(before & after).filter(
            self._any_col_differs("f", "l", val_cols)
        )

        def emit(dfj: DataFrame, prefix: str, ctype: str) -> DataFrame:
            return dfj.select(
                *keys,
                *[F.col(f"{prefix}.{c}").alias(c) for c in val_cols],
                F.lit(ctype).alias("_change_type"),
            )

        return (
            emit(inserts, "l", "insert")
            .unionByName(emit(deletes, "f", "delete"))
            .unionByName(emit(updated, "f", "update_preimage"))
            .unionByName(emit(updated, "l", "update_postimage"))
        )

    def snapshots(self) -> DataFrame:
        """Iceberg-style ``snapshots`` metadata table: one row per
        committed version, built ENTIRELY from manifests — no data file
        is opened. At 100 TB this is what answers "how many rows, which
        operation, what partition layout, how many files" for free; a
        ``COUNT(*)`` served from here costs O(versions), not a scan
        (Delta stores the same stats in its commit log for exactly this).
        ``n_files`` counts the snapshot's parquet files (driver-side
        directory walk — still metadata-only)."""
        rows = []
        for e in self.history():
            mn = self._n_files(e)  # inline count or chunk-descriptor sum
            if mn is not None:
                n_files = mn
            else:
                n_files = sum(
                    1
                    for d in (
                        *e.get("base_dirs", []),
                        e.get("data_dir", f"_v{e['version']}"),
                    )
                    for _root, _dirs, files in os.walk(os.path.join(self.path, d))
                    for f in files
                    if f.endswith(".parquet")
                )
            rows.append(
                (
                    e["version"],
                    e["operation"],
                    e.get("parent") or 0,
                    e["n_rows"],
                    n_files,
                    ",".join(e.get("partition_by") or []),
                )
            )
        return self.spark.createDataFrame(
            rows,
            schema="version long, operation string, parent long, "
            "n_rows long, n_files long, layout string",
        )

    def version_asof(self, ts: float) -> int:
        """Delta ``timestampAsOf`` resolution: the LATEST version whose
        ``committed_at`` is at-or-before ``ts`` (unix seconds). Answered
        entirely from manifests — O(versions) driver reads, no data
        access. Raises when ``ts`` predates the first commit (Delta's
        contract: there is no table state to serve)."""
        cands = [
            e["version"]
            for e in self.history()
            if e.get("committed_at") is not None and e["committed_at"] <= ts
        ]
        if not cands:
            raise ValueError(
                f"no snapshot at {self.path} committed at or before {ts}"
            )
        return max(cands)

    def read_asof(self, ts: float) -> DataFrame:
        """Time travel by TIMESTAMP (Delta's ``timestampAsOf`` /
        Iceberg's ``as-of-timestamp`` scan option): resolve the snapshot
        via :meth:`version_asof`, then read it like any other version
        (merge-on-read tombstones and branch-invisible staging dirs
        behave identically to :meth:`read_version`)."""
        return self.read_version(self.version_asof(ts))

    def read_version(self, version: int) -> DataFrame:
        """Time travel: read any committed snapshot (dir resolved through
        the manifest — staged/orphaned dirs are invisible). Merge-on-read
        versions resolve as base data ANTI-JOIN the accumulated deletion
        tombstones (one anti-join regardless of how many deletes stacked —
        the tombstone files union first)."""
        if version not in self._versions():
            raise ValueError(f"version {version} not committed at {self.path}")
        entry = self._manifest(version)
        if entry.get("pos_dv_dirs"):
            # POSITION tombstones: rows resolve by physical identity
            # (file, row_index) — no key contract involved. Checked BEFORE
            # file_granular: _read_with_positions resolves explicit file
            # lists itself, so MOR verbs compose with optimize snapshots.
            df = self._read_with_positions(entry).drop("__pos_f", "__pos_ri")
            hidden = entry.get("hidden_partition")
            return df.drop(hidden["name"]) if hidden else df
        if entry.get("file_granular"):
            # incremental-optimize snapshots: the EXPLICIT file list is
            # the source of truth — the referenced dirs also hold
            # superseded originals a directory read would resurrect
            files = self._file_stats_list(entry)
            df = self.spark.read.parquet(
                *[os.path.join(self.path, f["dir"], f["path"]) for f in files]
            )
            df = self._apply_column_mapping(df, entry)
            dv_dirs = entry.get("dv_dirs", [])
            if dv_dirs:
                # keyed tombstones over an optimize snapshot: same
                # anti-join the directory path applies
                dv = self.spark.read.parquet(
                    *[os.path.join(self.path, d) for d in dv_dirs]
                ).distinct()
                df = df.join(dv, on=entry["dv_keys"], how="left_anti")
            return df
        # incremental appends: the snapshot = carried-forward base dirs +
        # this commit's own directory (columns resolve by name)
        dirs = [*entry.get("base_dirs", []), entry.get("data_dir", f"_v{version}")]
        if entry.get("hidden_partition") and len(dirs) > 1:
            # sibling dirs each carrying their own hive layout: a single
            # multi-root read trips CONFLICTING_DIRECTORY_STRUCTURES; the
            # derived column lives only in the dir names (and is dropped
            # from the logical schema anyway), so read per dir and union
            from functools import reduce

            df = reduce(
                lambda a, b: a.unionByName(b, allowMissingColumns=True),
                [
                    self.spark.read.parquet(os.path.join(self.path, d))
                    for d in dirs
                ],
            )
        else:
            df = self.spark.read.parquet(
                *[os.path.join(self.path, d) for d in dirs]
            )
        # column mapping first: dv_keys recorded after a rename are
        # LOGICAL names, so tombstones anti-join the mapped schema
        df = self._apply_column_mapping(df, entry)
        dv_dirs = entry.get("dv_dirs", [])
        if dv_dirs:
            dv = self.spark.read.parquet(
                *[os.path.join(self.path, d) for d in dv_dirs]
            ).distinct()
            df = df.join(dv, on=entry["dv_keys"], how="left_anti")
        hidden = entry.get("hidden_partition")
        if hidden:
            # engine-derived partition column: never part of the schema
            df = df.drop(hidden["name"])
        return df

    # ----------------------------------------------------- column mapping

    @staticmethod
    def _apply_column_mapping(df: DataFrame, entry: dict) -> DataFrame:
        """Physical (on-disk) → logical schema: drop the dropped columns,
        apply the rename map, and hide the engine-derived hidden-partition
        column (it is never part of the logical schema — read_pruned /
        read_pruned_in used to leak ``__p_*`` into their result schemas,
        diverging from read_version). Zero data movement — pure projection."""
        for c in entry.get("column_drops", []):
            df = df.drop(c)
        renames = entry.get("column_renames")
        if renames:
            df = df.withColumnsRenamed(renames)
        hidden = entry.get("hidden_partition")
        if hidden and hidden["name"] in df.columns:
            df = df.drop(hidden["name"])
        return df

    @staticmethod
    def _physical_name(entry: dict, col: str) -> str:
        """Logical column name → the PHYSICAL name in the data files and
        per-file stats (identity unless the column was renamed)."""
        inv = {v: k for k, v in entry.get("column_renames", {}).items()}
        return inv.get(col, col)

    def _commit_column_mapping(
        self, op: str, renames: dict, drops: list[str]
    ) -> int:
        """METADATA-ONLY commit: the new manifest points at the parent's
        exact data (and stats) with an updated column mapping — zero
        bytes rewritten whatever the table size, exactly Delta's
        column-mapping rename/drop. Write set is unknown (None): a
        concurrent serializable merge written against the old names must
        conflict rather than silently rebase onto a renamed schema."""
        for _ in range(5):
            parent = self.current_version()
            if parent is None:
                raise ValueError(f"cannot alter empty table {self.path}")
            p_entry = self._manifest(parent)
            if self._is_mor(p_entry):
                raise ValueError(
                    "column mapping over pending deletion vectors is "
                    "ambiguous; compact first"
                )
            v = parent + 1
            token = uuid.uuid4().hex[:8]
            entry = {
                **{
                    k: p_entry.get(k)
                    for k in (
                        "n_rows",
                        "data_dir",
                        "partition_by",
                        "cluster_by",
                        "files",
                    )
                },
                **(
                    {"base_dirs": p_entry["base_dirs"]}
                    if p_entry.get("base_dirs")
                    else {}
                ),
                **(
                    {"checks": p_entry["checks"]}
                    if p_entry.get("checks")
                    else {}
                ),
                **(
                    {"uniques": p_entry["uniques"]}
                    if p_entry.get("uniques")
                    else {}
                ),
                **(
                    {"generated": p_entry["generated"]}
                    if p_entry.get("generated")
                    else {}
                ),
                **(
                    {"defaults": p_entry["defaults"]}
                    if p_entry.get("defaults")
                    else {}
                ),
                **(
                    {"identity": p_entry["identity"]}
                    if p_entry.get("identity")
                    else {}
                ),
                **(
                    {"hidden_partition": p_entry["hidden_partition"]}
                    if p_entry.get("hidden_partition")
                    else {}
                ),
                "version": v,
                "operation": op,
                "parent": parent,
                "cdf_dir": None,
                "committed_at": time.time(),
                "modified_keys": None,
                "txn": dict(self._txn_state(parent)),
                "column_renames": renames,
                "column_drops": drops,
            }
            os.makedirs(self._manifest_dir, exist_ok=True)
            tmp = os.path.join(self._manifest_dir, f".v{v}.{token}.json.tmp")
            with open(tmp, "w") as f:
                json.dump(entry, f)
            try:
                if self._link_version_slot(
                    tmp, os.path.join(self._manifest_dir, f"v{v}.json"), v
                ):
                    return v
                continue  # racer took the slot: recompute against its head
            finally:
                os.unlink(tmp)
        raise CommitConflict(
            f"lost 5 consecutive commit races at {self.path}"
        )

    def rename_column(self, old: str, new: str) -> int:
        """Delta column-mapping RENAME: a metadata-only commit maps the
        on-disk physical name to a new logical name — no file is opened,
        let alone rewritten, at any table size. Readers of the new
        version see ``new``; time travel to older versions still serves
        ``old``. Stats-planned scans (read_pruned / read_pruned_in /
        stats_agg / bloom sidecars) resolve logical→physical through the
        same mapping, so file skipping keeps working across renames. The
        next materializing commit (overwrite / merge / delete / a
        fallback append) writes logical names physically and clears the
        mapping."""
        parent = self.current_version()
        if parent is None:
            raise ValueError(f"cannot alter empty table {self.path}")
        entry = self._manifest(parent)
        logical = set(self._logical_columns(entry))
        if old not in logical:
            raise ValueError(f"no such column: {old!r}")
        if new in logical:
            raise ValueError(f"column {new!r} already exists")
        phys = self._physical_name(entry, old)
        if phys in (entry.get("partition_by") or []):
            raise ValueError(
                "renaming a hive partition column would orphan its "
                "directory encoding; rewrite with a new layout instead"
            )
        if refs := self._checks_referencing(entry, old):
            raise ValueError(
                f"column {old!r} is referenced by CHECK constraints "
                f"{refs}; drop them first"
            )
        if old in entry.get("identity", {}):
            raise ValueError(f"cannot rename identity column {old!r}")
        if old == (entry.get("hidden_partition") or {}).get("source"):
            raise ValueError(
                f"column {old!r} drives the snapshot's hidden "
                "partitioning; rewrite with a new layout instead"
            )
        renames = {
            k: v for k, v in entry.get("column_renames", {}).items() if v != old
        }
        renames[phys] = new
        return self._commit_column_mapping(
            "rename_column", renames, list(entry.get("column_drops", []))
        )

    def drop_column(self, col: str) -> int:
        """Delta column-mapping DROP: metadata-only — the physical column
        stays in the files (time travel still serves it) but disappears
        from every read of the new version onward. O(1) whatever the
        table size; the bytes are reclaimed by the next materializing
        commit or compaction."""
        parent = self.current_version()
        if parent is None:
            raise ValueError(f"cannot alter empty table {self.path}")
        entry = self._manifest(parent)
        if col not in self._logical_columns(entry):
            raise ValueError(f"no such column: {col!r}")
        phys = self._physical_name(entry, col)
        if phys in (entry.get("partition_by") or []):
            raise ValueError("cannot drop a hive partition column")
        if refs := self._checks_referencing(entry, col):
            raise ValueError(
                f"column {col!r} is referenced by CHECK constraints "
                f"{refs}; drop them first"
            )
        if col in entry.get("identity", {}):
            raise ValueError(f"cannot drop identity column {col!r}")
        if col == (entry.get("hidden_partition") or {}).get("source"):
            raise ValueError(
                f"column {col!r} drives the snapshot's hidden partitioning"
            )
        renames = {
            k: v for k, v in entry.get("column_renames", {}).items() if k != phys
        }
        drops = [*entry.get("column_drops", []), phys]
        return self._commit_column_mapping("drop_column", renames, drops)

    # ----------------------------------------------------------- checks

    @staticmethod
    def _checks_referencing(entry: dict, col: str) -> list[str]:
        """CHECK constraints AND generated-column expressions that mention
        ``col`` — a rename/drop of a referenced column would silently
        break either, so both block the mapping commit."""
        import re

        pat = re.compile(rf"\b{re.escape(col)}\b")
        return [
            n for n, e in entry.get("checks", {}).items() if pat.search(e)
        ] + [
            f"generated:{c}"
            for c, e in (entry.get("generated") or {}).items()
            if pat.search(e) or c == col
        ]

    def add_check(self, name: str, expr: str) -> int:
        """Delta ``ALTER TABLE ADD CONSTRAINT name CHECK (expr)``: the
        constraint is table metadata — recorded in the manifest, carried
        by every later commit, and enforced against the rows each commit
        writes (:class:`ConstraintViolation` aborts the commit before it
        publishes; O(new rows) on incremental appends). Like Delta, the
        EXISTING snapshot must already satisfy the constraint — validated
        here with one scan. ``expr`` is a SQL boolean over the logical
        schema."""
        from .constraints import enforce

        for _ in range(5):
            parent = self.current_version()
            if parent is None:
                raise ValueError(f"cannot alter empty table {self.path}")
            entry = self._manifest(parent)
            checks = dict(entry.get("checks", {}))
            if name in checks:
                raise ValueError(f"constraint {name!r} already exists")
            enforce(self.read_version(parent), {name: expr})
            checks[name] = expr
            v = self._link_metadata_commit(
                entry, parent, "add_check", {"checks": checks}
            )
            if v is not None:
                return v
        raise CommitConflict(f"lost 5 consecutive commit races at {self.path}")

    def add_unique(self, name: str, cols: list[str]) -> int:
        """``ALTER TABLE ADD CONSTRAINT name UNIQUE (cols)`` — the PK
        enforcement Delta and Iceberg DECLARE but do not enforce
        (Databricks PK constraints are informational; warehouses pay an
        index). Here it is table metadata enforced at COMMIT time
        against the candidate snapshot: any commit that would publish
        duplicate keys aborts with :class:`UniqueViolation` before the
        manifest links, costing one key-columns-only shuffle per commit
        (row-preserving ops — delete/compact/restore — skip it). The
        existing snapshot must already be unique, validated here with
        the same check."""
        from .constraints import enforce_unique

        for _ in range(5):
            parent = self.current_version()
            if parent is None:
                raise ValueError(f"cannot alter empty table {self.path}")
            entry = self._manifest(parent)
            cur_cols = self._logical_columns(entry)
            missing = [c for c in cols if c not in cur_cols]
            if missing:
                raise ValueError(f"unique constraint on unknown columns {missing}")
            uniques = dict(entry.get("uniques", {}))
            if name in uniques:
                raise ValueError(f"constraint {name!r} already exists")
            enforce_unique(self.read_version(parent), {name: list(cols)})
            uniques[name] = list(cols)
            v = self._link_metadata_commit(
                entry, parent, "add_unique", {"uniques": uniques}
            )
            if v is not None:
                return v
        raise CommitConflict(f"lost 5 consecutive commit races at {self.path}")

    def drop_unique(self, name: str) -> int:
        """Drop a UNIQUE constraint (metadata-only commit)."""
        for _ in range(5):
            parent = self.current_version()
            if parent is None:
                raise ValueError(f"cannot alter empty table {self.path}")
            entry = self._manifest(parent)
            uniques = dict(entry.get("uniques", {}))
            if name not in uniques:
                raise ValueError(f"no unique constraint {name!r}")
            del uniques[name]
            v = self._link_metadata_commit(
                entry, parent, "drop_unique", {"uniques": uniques}
            )
            if v is not None:
                return v
        raise CommitConflict(f"lost 5 consecutive commit races at {self.path}")

    def add_generated(self, col: str, expr: str) -> int:
        """Delta ``GENERATED ALWAYS AS (expr)``: record the generation
        expression as table metadata and BACKFILL the column into the
        current snapshot in the same materializing commit. From then on
        every write either computes the column (batch lacks it) or must
        match it null-safely — an implicit ``col <=> (expr)`` CHECK rides
        the constraints plumbing, so an explicit wrong value aborts the
        commit before it publishes (Delta's exact write contract).
        ``update_mor`` recomputes generated columns after applying its
        SET expressions and refuses to SET one directly."""
        from pyspark.sql import functions as F

        parent = self.current_version()
        if parent is None:
            raise ValueError(f"cannot alter empty table {self.path}")
        p_entry = self._manifest(parent)
        if col in (p_entry.get("generated") or {}):
            raise ValueError(f"generated column {col!r} already exists")
        if col in self.read_version(parent).columns:
            raise ValueError(
                f"column {col!r} already exists; generated columns are "
                "table-computed from declaration onward"
            )
        def build(cur: DataFrame | None) -> DataFrame:
            if cur is None:
                raise ValueError(f"cannot alter empty table {self.path}")
            return cur.withColumn(col, F.expr(expr))

        # generated_update as a callable: rebuilt from the CURRENT head's
        # manifest on every commit attempt, so losing a race to another
        # metadata writer can't republish a stale dict over its commit.
        return self._commit_with_retry(
            build,
            "add_generated",
            inherit_layout=True,
            generated_update=lambda e: {**(e.get("generated") or {}), col: expr},
        )

    def add_default(self, col: str, expr: str) -> int:
        """Delta ``ALTER TABLE ADD COLUMN col ... DEFAULT expr`` /
        ``ALTER COLUMN col SET DEFAULT expr``: from this commit on, a
        batch ARRIVING WITHOUT ``col`` takes the default at write time
        (an explicit NULL stays NULL — only absence fills; that is the
        SQL-standard DEFAULT contract, and the opposite of a generated
        column, which refuses explicit values). A NEW column is
        backfilled into the current snapshot in the same commit (one
        materializing rewrite — the trade vs Delta's per-file metadata
        fill is that reads here never need schema bookkeeping); an
        EXISTING column gains the default metadata-only. The default
        completes the column-metadata trio: generated (computed from
        other columns), identity (table-assigned), default (constant
        for absent input)."""
        from pyspark.sql import functions as F

        parent = self.current_version()
        if parent is None:
            raise ValueError(f"cannot alter empty table {self.path}")
        if col in self._logical_columns(self._manifest(parent)):
            # Metadata-only path. The manifest read, conflict checks, and
            # defaults-dict construction all live INSIDE the retry loop
            # (matching the sibling ALTER methods): rebuilding from the
            # CURRENT head on each attempt means a lost commit race never
            # republishes a stale dict — which would silently drop a
            # concurrent add_unique/drop_default/… metadata commit.
            for _ in range(5):
                parent = self.current_version()
                entry = self._manifest(parent)
                if col in (entry.get("generated") or {}):
                    raise ValueError(
                        f"column {col!r} is GENERATED; defaults don't apply"
                    )
                dfl = dict(entry.get("defaults") or {})
                if col in dfl:
                    raise ValueError(f"column {col!r} already has a default")
                dfl[col] = expr
                v = self._link_metadata_commit(
                    entry, parent, "add_default", {"defaults": dfl}
                )
                if v is not None:
                    return v
            raise CommitConflict(f"lost 5 consecutive commit races at {self.path}")

        # NEW column: validate, then backfill in one materializing commit.
        # defaults_update is a callable rebuilt from the head manifest per
        # commit attempt (same stale-dict-republish guard as the
        # metadata-only path above).
        p_entry = self._manifest(parent)
        if col in (p_entry.get("generated") or {}):
            raise ValueError(f"column {col!r} is GENERATED; defaults don't apply")
        if col in (p_entry.get("defaults") or {}):
            raise ValueError(f"column {col!r} already has a default")

        def build(cur: DataFrame | None) -> DataFrame:
            if cur is None:
                raise ValueError(f"cannot alter empty table {self.path}")
            return cur.withColumn(col, F.expr(expr))

        return self._commit_with_retry(
            build,
            "add_default",
            inherit_layout=True,
            defaults_update=lambda e: {**(e.get("defaults") or {}), col: expr},
        )

    def drop_default(self, col: str) -> int:
        """Metadata-only: stop defaulting ``col`` (absent input becomes
        NULL again, the pre-default behavior)."""
        for _ in range(5):
            parent = self.current_version()
            if parent is None:
                raise ValueError(f"cannot alter empty table {self.path}")
            entry = self._manifest(parent)
            dfl = dict(entry.get("defaults") or {})
            if col not in dfl:
                raise ValueError(f"no default on column {col!r}")
            del dfl[col]
            v = self._link_metadata_commit(
                entry, parent, "drop_default", {"defaults": dfl}
            )
            if v is not None:
                return v
        raise CommitConflict(f"lost 5 consecutive commit races at {self.path}")

    def drop_generated(self, col: str) -> int:
        """Metadata-only: stop generating/enforcing ``col`` (the column
        stays in the schema as ordinary data — dropping the DATA is a
        schema-evolution concern, like Delta)."""
        for _ in range(5):
            parent = self.current_version()
            if parent is None:
                raise ValueError(f"cannot alter empty table {self.path}")
            entry = self._manifest(parent)
            gen = dict(entry.get("generated") or {})
            if col not in gen:
                raise ValueError(f"no such generated column: {col!r}")
            del gen[col]
            v = self._link_metadata_commit(
                entry, parent, "drop_generated", {"generated": gen}
            )
            if v is not None:
                return v
        raise CommitConflict(f"lost 5 consecutive commit races at {self.path}")

    def drop_check(self, name: str) -> int:
        """Metadata-only DROP CONSTRAINT."""
        for _ in range(5):
            parent = self.current_version()
            if parent is None:
                raise ValueError(f"cannot alter empty table {self.path}")
            entry = self._manifest(parent)
            checks = dict(entry.get("checks", {}))
            if name not in checks:
                raise ValueError(f"no such constraint: {name!r}")
            del checks[name]
            v = self._link_metadata_commit(
                entry, parent, "drop_check", {"checks": checks}
            )
            if v is not None:
                return v
        raise CommitConflict(f"lost 5 consecutive commit races at {self.path}")

    def _link_metadata_commit(
        self, p_entry: dict, parent: int, op: str, updates: dict
    ) -> int | None:
        """One CAS-linked manifest that points at the parent's exact data
        with updated table metadata. Returns the version, or None on a
        lost race (caller recomputes against the new head)."""
        v = parent + 1
        token = uuid.uuid4().hex[:8]
        entry = {
            **{
                k: p_entry.get(k)
                for k in (
                    "n_rows",
                    "data_dir",
                    "partition_by",
                    "cluster_by",
                    "files",
                    "dv_dirs",
                    "dv_keys",
                )
            },
            **{
                k: p_entry[k]
                for k in (
                    "base_dirs",
                    "column_renames",
                    "column_drops",
                    "checks",
                    "identity",
                    "hidden_partition",
                    "generated",
                )
                if p_entry.get(k)
            },
            "version": v,
            "operation": op,
            "parent": parent,
            "cdf_dir": None,
            "committed_at": time.time(),
            "modified_keys": [],  # touches no rows: never conflicts
            "txn": dict(self._txn_state(parent)),
            **updates,
        }
        entry = {
            k: v2
            for k, v2 in entry.items()
            if k not in ("checks", "generated") or v2
        }
        if p_entry.get("pos_dv_dirs"):
            entry["pos_dv_dirs"] = p_entry["pos_dv_dirs"]
        if p_entry.get("file_granular"):
            entry["file_granular"] = True
            entry["base_dirs"] = p_entry.get("base_dirs", [])
        os.makedirs(self._manifest_dir, exist_ok=True)
        # CHUNKED parents: a metadata commit must keep the stats plane —
        # re-attached under this commit's own version+token (chunk files
        # are per-version: sharing names would let one version's expiry
        # unlink chunks another still references)
        chunk_paths: list[str] = []
        if p_entry.get("manifest_list") is not None:
            chunk_paths = self._attach_file_stats(
                entry, self._file_stats_list(p_entry), v, token
            )
        tmp = os.path.join(self._manifest_dir, f".v{v}.{token}.json.tmp")
        with open(tmp, "w") as f:
            json.dump(entry, f)
        try:
            if self._link_version_slot(
                tmp, os.path.join(self._manifest_dir, f"v{v}.json"), v
            ):
                return v
            for cp in chunk_paths:
                try:
                    os.unlink(cp)
                except FileNotFoundError:
                    pass
            return None
        finally:
            os.unlink(tmp)

    # ------------------------------------------------------------- clone

    def export_delta_log(self, version: int | None = None) -> str:
        """Export the snapshot as a REAL Delta Lake commit — a
        ``_delta_log/00000000000000000000.json`` under the table root
        whose actions follow the public Delta transaction-log protocol
        (protocol / metaData / add, one JSON object per line, version-
        numbered %020d filename), so any external Delta reader
        (delta-rs, duckdb's delta extension, Spark+delta) can open the
        table root and read this snapshot. This is Delta's own
        ``CONVERT TO DELTA`` direction: the log is written BESIDE the
        existing parquet files, referencing them by table-root-relative
        path — zero data bytes copied, O(files) JSON, whatever the table
        size.

        Faithful to the spec:
        - ``metaData.schemaString`` is the Spark StructType JSON (the
          exact format Delta uses), ``partitionColumns`` the snapshot's
          hive partition_by columns;
        - each ``add`` carries ``path`` (relative, URL-quoted),
          ``partitionValues`` (the spec's string map, recovered from the
          hive path segments — identity partition values are
          METADATA-borne; the files don't contain the column), ``size``,
          ``modificationTime``, ``dataChange``, and a ``stats`` JSON
          string with ``numRecords`` plus ``minValues``/``maxValues``
          for primitive columns when the manifest has them (Delta
          readers use these for file skipping, same as our manifests);
        - ``protocol`` pins minReader/WriterVersion 1/2 (plain parquet,
          no reader-side features needed).

        INCREMENTAL: a second call with the table advanced writes the
        NEXT %020d commit containing only the DIFF — ``add`` actions for
        new files, ``remove`` actions (deletionTimestamp, dataChange)
        for files the snapshot dropped, and a fresh ``metaData`` only
        when the schema changed — exactly how Delta writers keep a log
        in sync, O(changed files) per call. Re-exporting the same
        version is an idempotent no-op. The diff needs the PREVIOUSLY
        exported version's manifest to still exist (export before
        expiring history).

        Scope guards: MOR versions (pending tombstones have no plain-add
        representation — compact first), HIDDEN-partition (transform)
        layouts (Delta partitions are physical columns), column-mapped
        schemas (they need columnMapping metadata this minimal exporter
        doesn't emit), and partitionColumns CHANGES between exports
        (Delta fixes partitioning at table creation) raise; identity
        hive layouts export real partitionValues. The export pins
        NOTHING: expiring the snapshot afterwards (vacuum) dangles the
        log — tag the version to retain it.

        Returns the path of the commit file written."""
        v = self.current_version() if version is None else version
        if v is None:
            raise ValueError(f"cannot export empty table {self.path}")
        entry = self._manifest(v)
        if self._is_mor(entry):
            raise ValueError(
                "delta export of a merge-on-read version would resurrect "
                "tombstoned rows; compact first"
            )
        if entry.get("hidden_partition"):
            raise ValueError(
                "delta export of a hidden-partition layout has no Delta "
                "representation (Delta partitions are physical columns); "
                "compact to a clustered layout first"
            )
        if entry.get("column_renames") or entry.get("column_drops"):
            raise ValueError(
                "delta export of a column-mapped schema needs columnMapping "
                "metadata; materialize the mapping (compact) first"
            )
        part_cols: list[str] = list(entry.get("partition_by") or [])
        files = self._delta_file_list(entry)
        schema_json = self.read_version(v).schema.json()
        log_dir = os.path.join(self.path, "_delta_log")
        os.makedirs(log_dir, exist_ok=True)
        now_ms = int(time.time() * 1000)
        existing = sorted(
            fn for fn in os.listdir(log_dir)
            if len(fn) == 25 and fn.endswith(".json") and fn[:20].isdigit()
        )
        if not existing:
            actions = [
                {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
                self._delta_metadata_action(schema_json, now_ms, part_cols),
                *(self._delta_add_action(f, part_cols) for f in files),
            ]
            n_commit, op = 0, "CONVERT"
        else:
            # diff against the last exported snapshot
            v0, last_schema, last_parts = None, None, None
            for fn in existing:
                with open(os.path.join(log_dir, fn)) as fh:
                    for line in fh:
                        a = json.loads(line)
                        if "commitInfo" in a:
                            v0 = a["commitInfo"]["operationParameters"].get(
                                "sourceVersion", v0
                            )
                        elif "metaData" in a:
                            last_schema = a["metaData"]["schemaString"]
                            last_parts = a["metaData"].get(
                                "partitionColumns", []
                            )
            if v0 == v:
                return os.path.join(log_dir, existing[-1])  # idempotent
            if v0 is None or v < v0:
                raise ValueError(
                    f"delta log at {log_dir} is ahead of version {v} "
                    f"(last exported {v0}); the log is forward-only"
                )
            if last_schema is None:
                # pre-head commits truncated by checkpoint retention: the
                # metaData/partitioning contract lives in the checkpoint
                from .delta_import import _read_checkpoint

                cp = _read_checkpoint(log_dir)
                if cp is not None:
                    last_schema, last_parts = cp[2], cp[3]
            if last_parts is not None and last_parts != part_cols:
                # Delta's partitioning is fixed at table creation; a
                # layout change between exports has no log representation
                raise ValueError(
                    "delta export does not evolve partitionColumns; the "
                    "table's partition_by changed since the last export "
                    "(compact to one layout first)"
                )
            prev = {
                f["__rel"]: f for f in self._delta_file_list(self._manifest(v0))
            }
            cur = {f["__rel"]: f for f in files}
            actions = []
            if last_schema != schema_json:
                actions.append(
                    self._delta_metadata_action(schema_json, now_ms, part_cols)
                )
            actions.extend(
                self._delta_add_action(cur[r], part_cols)
                for r in cur
                if r not in prev
            )
            actions.extend(
                {
                    "remove": {
                        "path": _dl_quote(r),
                        "deletionTimestamp": now_ms,
                        "dataChange": True,
                    }
                }
                for r in prev
                if r not in cur
            )
            # NOT len(existing): after checkpoint retention truncates old
            # commits the count undershoots — versions must continue from
            # the last commit file's own number
            n_commit, op = int(existing[-1][:20]) + 1, "WRITE"
        actions.append(
            {
                "commitInfo": {
                    "timestamp": now_ms,
                    "operation": op,
                    "operationParameters": {"sourceVersion": v},
                    "engineInfo": "retail-datalakehouse-spark",
                }
            }
        )
        commit = os.path.join(log_dir, f"{n_commit:020d}.json")
        tmp = commit + ".tmp"
        with open(tmp, "w") as fh:
            for a in actions:
                fh.write(json.dumps(a) + "\n")
        os.replace(tmp, commit)
        return commit

    def _delta_file_list(self, entry: dict) -> list[dict]:
        """The snapshot's files with their table-root-relative path under
        ``__rel`` (the identity delta add/remove actions diff on)."""
        files = self._file_stats_list(entry)
        p_dir = entry["data_dir"]
        if files is None:
            # stats omitted (huge commit): walk the snapshot's dirs
            files = []
            for d in {p_dir, *entry.get("base_dirs", [])}:
                full = os.path.join(self.path, d)
                files.extend(
                    {"path": fn, "dir": d, "n_rows": None, "stats": {}}
                    for fn in sorted(os.listdir(full))
                    if fn.endswith(".parquet")
                )
        return [
            {**f, "__rel": f"{f.get('dir', p_dir)}/{f['path']}"} for f in files
        ]

    @staticmethod
    def _delta_metadata_action(
        schema_json: str, now_ms: int, part_cols: list[str] | None = None
    ) -> dict:
        return {
            "metaData": {
                "id": uuid.uuid4().hex,
                "format": {"provider": "parquet", "options": {}},
                "schemaString": schema_json,
                "partitionColumns": list(part_cols or []),
                "configuration": {},
                "createdTime": now_ms,
            }
        }

    def _delta_add_action(
        self, f: dict, part_cols: list[str] | None = None
    ) -> dict:
        rel = f["__rel"]
        st = os.stat(os.path.join(self.path, rel))
        stats = {"numRecords": f.get("n_rows")}
        mins = {
            c: b[0]
            for c, b in f.get("stats", {}).items()
            if not c.startswith("__") and b[0] is not None
        }
        if mins:
            stats["minValues"] = mins
            stats["maxValues"] = {c: f["stats"][c][1] for c in mins}
        return {
            "add": {
                "path": _dl_quote(rel),
                # Delta's metadata-borne identity partition values (the
                # spec's string map; files under a hive layout don't
                # contain the column)
                "partitionValues": _hive_partition_values(
                    rel, part_cols or []
                ),
                "size": st.st_size,
                "modificationTime": int(st.st_mtime * 1000),
                "dataChange": True,
                "stats": json.dumps(stats),
            }
        }

    def export_delta_checkpoint(self) -> str:
        """Write a Delta-protocol PARQUET CHECKPOINT of the exported
        log's head: ``_delta_log/<version>.checkpoint.parquet`` (one
        action per row — protocol / metaData / add struct columns, the
        spec's classic checkpoint shape) plus the ``_last_checkpoint``
        pointer file readers consult first. This is what bounds log
        replay on a long-lived table: a reader seeds its state from the
        checkpoint and replays only the JSON commits AFTER it —
        O(commits-since-checkpoint), not O(table lifetime) — and it is
        the precondition for :meth:`truncate_delta_log` (Delta's
        metadata-cleanup retention can only delete JSON commits a
        checkpoint already covers).

        State is reconstructed by replaying this table's own exported
        JSON log (stdlib — the checkpoint must reflect the LOG's
        truth, not the VersionedTable's), and the parquet is written
        with pyarrow directly: O(live files) rows, zero data reads,
        no Spark job. Returns the checkpoint path."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        log_dir = os.path.join(self.path, "_delta_log")
        commits = sorted(
            fn for fn in os.listdir(log_dir)
            if len(fn) == 25 and fn.endswith(".json") and fn[:20].isdigit()
        ) if os.path.isdir(log_dir) else []
        if not commits:
            raise ValueError(f"no exported delta log under {self.path}")
        head = int(commits[-1][:20])
        live: dict[str, dict] = {}
        meta_action: dict | None = None
        proto = {"minReaderVersion": 1, "minWriterVersion": 2}
        from urllib.parse import unquote as _unq

        for fn in commits:
            with open(os.path.join(log_dir, fn)) as fh:
                for line in fh:
                    a = json.loads(line)
                    if "add" in a:
                        live[_unq(a["add"]["path"])] = a["add"]
                    elif "remove" in a:
                        live.pop(_unq(a["remove"]["path"]), None)
                    elif "metaData" in a:
                        meta_action = a["metaData"]
                    elif "protocol" in a:
                        proto = a["protocol"]
        assert meta_action is not None

        proto_t = pa.struct(
            [("minReaderVersion", pa.int32()), ("minWriterVersion", pa.int32())]
        )
        meta_t = pa.struct(
            [
                ("id", pa.string()),
                ("format", pa.struct([("provider", pa.string())])),
                ("schemaString", pa.string()),
                ("partitionColumns", pa.list_(pa.string())),
                ("createdTime", pa.int64()),
            ]
        )
        add_t = pa.struct(
            [
                ("path", pa.string()),
                ("partitionValues", pa.map_(pa.string(), pa.string())),
                ("size", pa.int64()),
                ("modificationTime", pa.int64()),
                ("dataChange", pa.bool_()),
                ("stats", pa.string()),
            ]
        )
        n_rows = 2 + len(live)
        protocols = [proto] + [None] * (n_rows - 1)
        metas = [
            None,
            {
                "id": meta_action["id"],
                "format": {"provider": "parquet"},
                "schemaString": meta_action["schemaString"],
                "partitionColumns": meta_action.get("partitionColumns", []),
                "createdTime": meta_action.get("createdTime"),
            },
        ] + [None] * (n_rows - 2)
        adds: list[dict | None] = [None, None]
        for add in live.values():
            adds.append(
                {
                    "path": add["path"],
                    "partitionValues": list(
                        (add.get("partitionValues") or {}).items()
                    ),
                    "size": add.get("size"),
                    "modificationTime": add.get("modificationTime"),
                    "dataChange": True,
                    "stats": add.get("stats"),
                }
            )
        table = pa.table(
            {
                "protocol": pa.array(protocols, type=proto_t),
                "metaData": pa.array(metas, type=meta_t),
                "add": pa.array(adds, type=add_t),
            }
        )
        cp_path = os.path.join(log_dir, f"{head:020d}.checkpoint.parquet")
        pq.write_table(table, cp_path)
        ptr = os.path.join(log_dir, "_last_checkpoint")
        with open(ptr + ".tmp", "w") as fh:
            json.dump({"version": head, "size": n_rows}, fh)
        os.replace(ptr + ".tmp", ptr)
        return cp_path

    def truncate_delta_log(self) -> int:
        """Delta metadata-cleanup retention: delete JSON commits STRICTLY
        BELOW the checkpointed version (the checkpoint covers their
        state; the head JSON stays so the exporter's forward-only
        version/lineage scan keeps working). Refuses without a
        checkpoint — exactly Delta's rule that log cleanup never
        outruns the last checkpoint. Returns the number of commit
        files deleted; readers must now seed from the checkpoint for
        any version at-or-above it, and time travel BELOW it is gone
        (expired history — the documented trade of retention)."""
        log_dir = os.path.join(self.path, "_delta_log")
        ptr = os.path.join(log_dir, "_last_checkpoint")
        if not os.path.exists(ptr):
            raise ValueError(
                "truncate_delta_log requires a checkpoint "
                "(export_delta_checkpoint first)"
            )
        with open(ptr) as fh:
            cp_ver = int(json.load(fh)["version"])
        n = 0
        for fn in sorted(os.listdir(log_dir)):
            if len(fn) == 25 and fn.endswith(".json") and fn[:20].isdigit():
                if int(fn[:20]) < cp_ver:
                    os.remove(os.path.join(log_dir, fn))
                    n += 1
        return n

    # ------------------------------------------------- iceberg interop

    def export_iceberg_metadata(self, version: int | None = None) -> str:
        """Export the snapshot as an Iceberg-spec-shaped metadata tree —
        the counterpart of :meth:`export_delta_log` on the other side of
        the open-table-format fence (Iceberg's own ``add_files`` /
        migrate direction): ``metadata/v<N>.metadata.json`` +
        ``version-hint.text`` (the HadoopCatalog convention), a
        per-snapshot MANIFEST LIST, and per-manifest DATA FILE entry
        lists, all written BESIDE the existing parquet and referencing
        it by table-root-relative path — zero data bytes copied,
        O(files) metadata whatever the table size.

        Faithful to the Iceberg v2 spec's STRUCTURE (the container has
        no Avro tooling, so manifest lists and manifests serialize as
        JSON with the spec's field names — the same documented stand-in
        the Delta exporter uses for its log):

        - table metadata carries format-version 2, table-uuid, schemas
          with stable FIELD IDS (Iceberg's column-identity mechanism;
          the name->id map persists in properties so ids survive schema
          evolution between exports), partition-specs (identity
          transforms over the snapshot's hive partition_by columns —
          empty spec for unpartitioned layouts), sort-orders,
          current-snapshot-id, the full snapshots list, snapshot-log
          and metadata-log;
        - each snapshot points at ONE manifest-list file; the list
          carries per-manifest summary counts (added/existing/deleted
          files and rows, sequence numbers) — the layer Iceberg's scan
          planning prunes FIRST, before touching any manifest;
        - manifests hold per-file entries: status (1=ADDED, 0=EXISTING,
          2=DELETED), the writing snapshot-id, sequence-number, and the
          data_file struct (file_path, PARQUET, record_count,
          file_size_in_bytes, metadata-borne identity partition values
          recovered from the hive path segments, lower/upper bounds
          keyed by field-id when the table manifest has footer stats).

        INCREMENTAL, the Iceberg way: a second call with the table
        advanced writes v<N+1>.metadata.json whose new snapshot (a)
        REUSES every prior manifest whose files all survive — by
        reference, unread and unmodified, which is how Iceberg keeps
        append cost O(new files) on a million-file table; (b) REWRITES
        any manifest that lost files, keeping survivors as EXISTING and
        recording the lost ones as DELETED entries (what Iceberg's
        rewrite/expire machinery emits); (c) ADDS one manifest for the
        new files. parent-snapshot-id chains the lineage; re-exporting
        the same source version is an idempotent no-op; exporting an
        OLDER version than the last export raises (metadata lineage is
        forward-only).

        Readers do NOT replay a log: an Iceberg read resolves one
        snapshot → one manifest list → live entries (status != DELETED)
        — see ``sources/iceberg_import.py``, the independent stdlib-JSON
        reader half. Scope guards: MOR versions, HIDDEN-partition
        (transform) layouts, column-mapped schemas, and partition-spec
        changes between exports raise (compact first); identity-
        partitioned hive layouts export with a real partition spec.

        Returns the path of the metadata file written."""
        v = self.current_version() if version is None else version
        if v is None:
            raise ValueError(f"cannot export empty table {self.path}")
        entry = self._manifest(v)
        if self._is_mor(entry):
            raise ValueError(
                "iceberg export of a merge-on-read version would resurrect "
                "tombstoned rows; compact first"
            )
        if entry.get("hidden_partition"):
            raise ValueError(
                "iceberg export of a hidden-partition layout needs transform "
                "partition specs; compact to a clustered layout first"
            )
        part_cols: list[str] = list(entry.get("partition_by") or [])
        if entry.get("column_renames") or entry.get("column_drops"):
            raise ValueError(
                "iceberg export of a column-mapped schema needs name-mapping "
                "metadata; materialize the mapping (compact) first"
            )
        meta_dir = os.path.join(self.path, "metadata")
        os.makedirs(meta_dir, exist_ok=True)
        now_ms = int(time.time() * 1000)
        files = self._delta_file_list(entry)  # same identity: rel paths

        hint = os.path.join(meta_dir, "version-hint.text")
        prev_meta: dict | None = None
        if os.path.exists(hint):
            with open(hint) as fh:
                n_prev = int(fh.read().strip())
            with open(
                os.path.join(meta_dir, f"v{n_prev}.metadata.json")
            ) as fh:
                prev_meta = json.load(fh)
        else:
            n_prev = 0

        if prev_meta is not None:
            v0 = int(prev_meta["properties"]["rdl.source-version"])
            if v0 == v:
                return os.path.join(meta_dir, f"v{n_prev}.metadata.json")
            if v < v0:
                raise ValueError(
                    f"iceberg metadata at {meta_dir} is ahead of version "
                    f"{v} (last exported {v0}); the lineage is forward-only"
                )

        # ---- field-id stability + schema evolution (Iceberg's contract:
        # ids survive schema changes; each snapshot pins its schema-id).
        # The persisted name->id map (properties["rdl.field-ids"]) keeps
        # ids stable across exports even when columns were added between
        # them — prior snapshots' id-keyed bounds never re-key.
        schema = self.read_version(v).schema
        prev_ids: dict[str, int] = {}
        prev_schemas: list[dict] = []
        if prev_meta is not None:
            prev_schemas = prev_meta["schemas"]
            prev_ids = {
                k: int(i)
                for k, i in json.loads(
                    prev_meta["properties"].get("rdl.field-ids", "{}")
                ).items()
            }
            if not prev_ids:
                # pre-map exports minted 1..n over their current schema;
                # reconstruct the map from the last current schema so ids
                # stay pinned from here on.
                last = next(
                    s
                    for s in prev_schemas
                    if s["schema-id"] == prev_meta["current-schema-id"]
                )
                prev_ids = {f["name"]: f["id"] for f in last["fields"]}
        ice_schema, field_ids = _iceberg_schema(schema, prev_ids or None)
        if prev_meta is None:
            schema_id = 0
            schemas = [ice_schema]  # minted with schema-id 0
        else:
            last = next(
                s
                for s in prev_schemas
                if s["schema-id"] == prev_meta["current-schema-id"]
            )
            if last["fields"] == ice_schema["fields"]:
                schema_id = prev_meta["current-schema-id"]
                schemas = prev_schemas
            else:
                # evolved: RETAIN prior schemas (old snapshots keep
                # resolving against the schema they were written with)
                # and append the new one under a fresh schema-id.
                schema_id = max(s["schema-id"] for s in prev_schemas) + 1
                ice_schema = {**ice_schema, "schema-id": schema_id}
                schemas = prev_schemas + [ice_schema]

        # ---- partition spec (identity transforms over the hive layout's
        # partition_by columns; Iceberg's metadata-born partition values)
        spec_fields = [
            {
                "name": c,
                "transform": "identity",
                "source-id": field_ids[c],
                "field-id": 1000 + i,
            }
            for i, c in enumerate(part_cols)
        ]
        if prev_meta is not None:
            prev_spec = next(
                s
                for s in prev_meta["partition-specs"]
                if s["spec-id"] == prev_meta["default-spec-id"]
            )
            if [f["name"] for f in prev_spec["fields"]] != part_cols:
                raise ValueError(
                    "iceberg export does not evolve partition specs; the "
                    "table's partition_by changed since the last export "
                    "(compact to one layout first)"
                )

        seq = (prev_meta["last-sequence-number"] + 1) if prev_meta else 1
        snap_id = int(uuid.uuid4().int % (1 << 62))
        cur = {f["__rel"]: f for f in files}

        manifest_list: list[dict] = []
        claimed: set[str] = set()
        if prev_meta is not None:
            prev_snap = next(
                s
                for s in prev_meta["snapshots"]
                if s["snapshot-id"] == prev_meta["current-snapshot-id"]
            )
            with open(
                os.path.join(self.path, prev_snap["manifest-list"])
            ) as fh:
                prev_list = json.load(fh)["manifests"]
            for m in prev_list:
                with open(os.path.join(self.path, m["manifest_path"])) as fh:
                    m_entries = json.load(fh)["entries"]
                live = [
                    e for e in m_entries if e["status"] != 2  # not DELETED
                ]
                survivors = [
                    e for e in live if e["data_file"]["file_path"] in cur
                ]
                claimed.update(e["data_file"]["file_path"] for e in live)
                if not live:
                    # every entry already DELETED: readers prune it, but
                    # carrying it forward would re-append the dead
                    # manifest to every future manifest list (O(exports ×
                    # dead manifests) metadata growth) — drop it instead.
                    continue
                if len(survivors) == len(live):
                    # untouched: carry the manifest forward BY REFERENCE
                    manifest_list.append(
                        {
                            **m,
                            "existing_files_count": m["added_files_count"]
                            + m["existing_files_count"],
                            "added_files_count": 0,
                            "existing_rows_count": m["added_rows_count"]
                            + m["existing_rows_count"],
                            "added_rows_count": 0,
                            "deleted_files_count": 0,
                            "deleted_rows_count": 0,
                        }
                    )
                    continue
                # lost files: rewrite with EXISTING survivors + DELETED losses
                rewritten = [
                    {**e, "status": 0} for e in survivors
                ] + [
                    {**e, "status": 2, "snapshot_id": snap_id,
                     "sequence_number": seq}
                    for e in live
                    if e["data_file"]["file_path"] not in cur
                ]
                if rewritten:
                    manifest_list.append(
                        self._write_iceberg_manifest(
                            meta_dir, rewritten, snap_id, seq,
                            min_seq=m["min_sequence_number"],
                        )
                    )
        new_files = [f for f in files if f["__rel"] not in claimed]
        if new_files or not manifest_list:
            new_entries = [
                {
                    "status": 1,  # ADDED
                    "snapshot_id": snap_id,
                    "sequence_number": seq,
                    "data_file": self._iceberg_data_file(
                        f, field_ids, part_cols
                    ),
                }
                for f in new_files
            ]
            if new_entries:
                manifest_list.append(
                    self._write_iceberg_manifest(
                        meta_dir, new_entries, snap_id, seq, min_seq=seq
                    )
                )

        ml_name = f"metadata/snap-{snap_id}-manifest-list.json"
        with open(os.path.join(self.path, ml_name), "w") as fh:
            json.dump({"manifests": manifest_list}, fh, indent=1)
        n_added = sum(m["added_files_count"] for m in manifest_list)
        n_deleted = sum(m["deleted_files_count"] for m in manifest_list)
        # Iceberg summary operations: first export = the migrate
        # overwrite; then the diff decides (append / delete / overwrite)
        if prev_meta is None:
            operation = "overwrite"
        elif n_deleted == 0:
            operation = "append"
        elif n_added == 0:
            operation = "delete"
        else:
            operation = "overwrite"
        snapshot = {
            "snapshot-id": snap_id,
            "sequence-number": seq,
            "timestamp-ms": now_ms,
            "summary": {
                "operation": operation,
                "rdl.source-version": str(v),
            },
            "manifest-list": ml_name,
            "schema-id": schema_id,
        }
        if prev_meta is not None:
            snapshot["parent-snapshot-id"] = prev_meta["current-snapshot-id"]
        n_meta = n_prev + 1
        meta = {
            "format-version": 2,
            "table-uuid": prev_meta["table-uuid"] if prev_meta
            else uuid.uuid4().hex,
            "location": self.path,
            "last-sequence-number": seq,
            "last-updated-ms": now_ms,
            "last-column-id": max(field_ids.values()),
            "current-schema-id": schema_id,
            "schemas": schemas,
            "default-spec-id": 0,
            "partition-specs": [{"spec-id": 0, "fields": spec_fields}],
            "last-partition-id": 999 + len(spec_fields),
            "default-sort-order-id": 0,
            "sort-orders": [{"order-id": 0, "fields": []}],
            "properties": {
                "rdl.source-version": str(v),
                # persisted name->id map (incl. dropped columns, so their
                # ids stay retired): the field-id stability anchor for
                # every future export
                "rdl.field-ids": json.dumps(field_ids, sort_keys=True),
            },
            "current-snapshot-id": snap_id,
            "snapshots": (prev_meta["snapshots"] if prev_meta else [])
            + [snapshot],
            "snapshot-log": (prev_meta["snapshot-log"] if prev_meta else [])
            + [{"timestamp-ms": now_ms, "snapshot-id": snap_id}],
            "metadata-log": (
                (prev_meta["metadata-log"] if prev_meta else [])
                + (
                    [
                        {
                            "timestamp-ms": prev_meta["last-updated-ms"],
                            "metadata-file": f"metadata/v{n_prev}.metadata.json",
                        }
                    ]
                    if prev_meta
                    else []
                )
            ),
        }
        meta_path = os.path.join(meta_dir, f"v{n_meta}.metadata.json")
        tmp = meta_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(meta, fh, indent=1)
        os.replace(tmp, meta_path)
        with open(hint + ".tmp", "w") as fh:
            fh.write(str(n_meta))
        os.replace(hint + ".tmp", hint)
        return meta_path

    def expire_iceberg_snapshots(self, keep_last: int = 1) -> str:
        """Iceberg snapshot EXPIRATION (`expireSnapshots` / the
        `expire_snapshots` procedure) over the exported metadata tree —
        the retention half of the lifecycle that export/incremental/
        import built: history is useful until it isn't, and a table
        exported daily for a year carries 365 snapshots whose metadata
        (and time-travel surface) someone must eventually bound.

        Semantics, faithful to Iceberg's:
        - the newest ``keep_last`` snapshots survive (the CURRENT
          snapshot always does — keep_last < 1 raises);
        - expired snapshot objects leave ``snapshots`` and their rows
          leave ``snapshot-log``; surviving snapshots are untouched —
          each is self-contained, so nothing needs rewriting;
        - manifest-LIST files of expired snapshots are deleted; manifest
          files are deleted only when NO surviving snapshot's list still
          references them (reuse-by-reference means a manifest can be
          shared across many snapshots);
        - DATA files are never touched (orphan-file cleanup is a
          separate maintenance op in Iceberg too — expiry is a
          metadata-layer contract);
        - the result is written as the NEXT metadata version
          (v<N+1>.metadata.json) + version-hint bump, so expiry itself
          is a visible, ordered metadata event (Iceberg's
          commit-on-expire behavior); parent-snapshot-id of the oldest
          survivor is dropped if its parent was expired.

        O(snapshots + manifests) metadata work, zero data reads, any
        table size. Returns the new metadata path."""
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1 (current must survive)")
        meta_dir = os.path.join(self.path, "metadata")
        hint = os.path.join(meta_dir, "version-hint.text")
        if not os.path.exists(hint):
            raise ValueError(f"no exported iceberg metadata at {meta_dir}")
        with open(hint) as fh:
            n_prev = int(fh.read().strip())
        with open(os.path.join(meta_dir, f"v{n_prev}.metadata.json")) as fh:
            meta = json.load(fh)

        snaps = meta["snapshots"]
        if len(snaps) <= keep_last:
            return os.path.join(meta_dir, f"v{n_prev}.metadata.json")
        # snapshots list is append-ordered; survivors = newest keep_last
        keep = snaps[-keep_last:]
        expired = snaps[:-keep_last]
        keep_ids = {s["snapshot-id"] for s in keep}
        assert meta["current-snapshot-id"] in keep_ids

        def _manifests_of(s: dict) -> set[str]:
            with open(os.path.join(self.path, s["manifest-list"])) as fh:
                return {m["manifest_path"] for m in json.load(fh)["manifests"]}

        still_referenced: set[str] = set()
        for s in keep:
            still_referenced |= _manifests_of(s)
        to_delete_manifests: set[str] = set()
        for s in expired:
            to_delete_manifests |= _manifests_of(s) - still_referenced

        # drop the oldest survivor's parent pointer if its parent expired
        keep = [dict(s) for s in keep]
        expired_ids = {s["snapshot-id"] for s in expired}
        if keep and keep[0].get("parent-snapshot-id") in expired_ids:
            keep[0].pop("parent-snapshot-id", None)

        now_ms = int(time.time() * 1000)
        new_meta = dict(meta)
        new_meta["snapshots"] = keep
        new_meta["snapshot-log"] = [
            e for e in meta["snapshot-log"] if e["snapshot-id"] in keep_ids
        ]
        new_meta["last-updated-ms"] = now_ms
        new_meta["metadata-log"] = meta["metadata-log"] + [
            {
                "timestamp-ms": meta["last-updated-ms"],
                "metadata-file": f"metadata/v{n_prev}.metadata.json",
            }
        ]
        n_meta = n_prev + 1
        meta_path = os.path.join(meta_dir, f"v{n_meta}.metadata.json")
        tmp = meta_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(new_meta, fh, indent=1)
        os.replace(tmp, meta_path)
        with open(hint + ".tmp", "w") as fh:
            fh.write(str(n_meta))
        os.replace(hint + ".tmp", hint)
        # physical metadata deletes LAST, after the commit point — a
        # crash beforehand leaves a valid tree with orphan files, never
        # a dangling reference
        for s in expired:
            p = os.path.join(self.path, s["manifest-list"])
            if os.path.exists(p):
                os.remove(p)
        for m in to_delete_manifests:
            p = os.path.join(self.path, m)
            if os.path.exists(p):
                os.remove(p)
        return meta_path

    def _write_iceberg_manifest(
        self,
        meta_dir: str,
        entries: list[dict],
        snap_id: int,
        seq: int,
        min_seq: int,
    ) -> dict:
        """Write one manifest file and return its manifest-list entry
        (the summary counts scan planning prunes on before opening it)."""
        name = f"metadata/manifest-{seq}-{uuid.uuid4().hex[:8]}.json"
        path = os.path.join(self.path, name)
        with open(path, "w") as fh:
            json.dump({"content": "data", "entries": entries}, fh, indent=1)

        def _n(status: int) -> tuple[int, int]:
            es = [e for e in entries if e["status"] == status]
            return len(es), sum(
                e["data_file"]["record_count"] or 0 for e in es
            )

        a_f, a_r = _n(1)
        e_f, e_r = _n(0)
        d_f, d_r = _n(2)
        return {
            "manifest_path": name,
            "manifest_length": os.path.getsize(path),
            "partition_spec_id": 0,
            "content": 0,
            "sequence_number": seq,
            "min_sequence_number": min_seq,
            "added_snapshot_id": snap_id,
            "added_files_count": a_f,
            "existing_files_count": e_f,
            "deleted_files_count": d_f,
            "added_rows_count": a_r,
            "existing_rows_count": e_r,
            "deleted_rows_count": d_r,
        }

    def _iceberg_data_file(
        self,
        f: dict,
        field_ids: dict[str, int],
        part_cols: list[str] | None = None,
    ) -> dict:
        rel = f["__rel"]
        st = os.stat(os.path.join(self.path, rel))
        # Identity-transform partition values are METADATA-borne in
        # Iceberg (readers never open a file to learn its partition):
        # recover them from the hive path segments the writer laid down.
        partition = _hive_partition_values(rel, part_cols or [])
        df: dict = {
            "content": 0,  # DATA (1/2 = eq/pos deletes, never exported)
            "file_path": rel,
            "file_format": "PARQUET",
            "partition": partition,
            "record_count": f.get("n_rows"),
            "file_size_in_bytes": st.st_size,
        }
        # Iceberg bounds maps OMIT columns with missing bounds (a null
        # bound value is never written); lower and upper are independent
        # maps — a column can carry one without the other.
        lower = {
            str(field_ids[c]): b[0]
            for c, b in f.get("stats", {}).items()
            if c in field_ids and not c.startswith("__") and b[0] is not None
        }
        upper = {
            str(field_ids[c]): b[1]
            for c, b in f.get("stats", {}).items()
            if c in field_ids and not c.startswith("__") and b[1] is not None
        }
        if lower:
            df["lower_bounds"] = lower
        if upper:
            df["upper_bounds"] = upper
        return df

    def clone_to(
        self,
        dest_path: str,
        version: int | None = None,
        shallow: bool = True,
    ) -> "VersionedTable":
        """Delta SHALLOW CLONE: create a new, independently-writable table
        at ``dest_path`` whose v1 manifest references THIS table's data
        files in place — zero bytes copied, O(1) whatever the table size
        (cloning a 100 TB table costs one JSON write). The clone carries
        the source snapshot's file stats, deletion vectors, column
        mapping, and layout, so manifest-planned reads (read_pruned /
        read_pruned_in / stats_agg) keep pruning on the clone without
        re-deriving anything.

        Divergence is free in both directions: later commits to the
        source are invisible to the clone (it pinned one version), and
        the clone's own commits land under ``dest_path`` — incremental
        appends chain new files onto the referenced base, while any
        materializing commit (overwrite / merge / delete / compact)
        rewrites under the clone's root and drops the last reference to
        the source. External references are absolute paths; the clone's
        ``vacuum`` can never touch them (it only considers directories
        under its own root). Caveat shared with Delta shallow clones:
        vacuuming / expiring the SOURCE's referenced snapshot breaks the
        clone — compact (or any materializing commit on) the clone first
        to make it self-contained.

        ``shallow=False`` (DEEP clone) copies the snapshot's data into
        the destination — O(table), one distributed read-write, no
        lingering reference to the source. Use it when the clone must
        outlive the source's retention."""
        v = self.current_version() if version is None else version
        if v is None:
            raise ValueError(f"cannot clone empty table {self.path}")
        if v not in self._versions():
            raise ValueError(f"version {v} not committed at {self.path}")
        if not shallow:
            clone = VersionedTable(
                self.spark,
                dest_path,
                record_cdf=self._record_cdf,
                cdf_keys=self._cdf_keys or None,
            )
            if clone._versions():
                raise ValueError(f"clone destination {dest_path} is not empty")
            clone.overwrite(self.read_version(v))
            return clone
        src = self._manifest(v)

        def _abs(d: str) -> str:
            return d if os.path.isabs(d) else os.path.join(self.path, d)

        files = self._file_stats_list(src)  # resolves source chunking
        if files is not None:
            src_dir = src["data_dir"]
            files = [{**f, "dir": _abs(f.get("dir", src_dir))} for f in files]
        entry = {
            "version": 1,
            "operation": "clone",
            "parent": None,
            "n_rows": src["n_rows"],
            "data_dir": _abs(src.get("data_dir", f"_v{v}")),
            **(
                {"base_dirs": [_abs(d) for d in src["base_dirs"]]}
                if src.get("base_dirs")
                else {}
            ),
            "dv_dirs": [_abs(d) for d in src.get("dv_dirs", [])],
            "pos_dv_dirs": [_abs(d) for d in src.get("pos_dv_dirs", [])],
            **({"file_granular": True} if src.get("file_granular") else {}),
            "dv_keys": src.get("dv_keys"),
            "partition_by": src.get("partition_by"),
            "cluster_by": src.get("cluster_by"),
            **(
                {"column_renames": src["column_renames"]}
                if src.get("column_renames")
                else {}
            ),
            **(
                {"column_drops": src["column_drops"]}
                if src.get("column_drops")
                else {}
            ),
            **({"checks": src["checks"]} if src.get("checks") else {}),
            **({"generated": src["generated"]} if src.get("generated") else {}),
            **({"identity": src["identity"]} if src.get("identity") else {}),
            **(
                {"hidden_partition": src["hidden_partition"]}
                if src.get("hidden_partition")
                else {}
            ),
            "cdf_dir": None,
            "modified_keys": None,
            "txn": {},
            "committed_at": time.time(),
            # lineage, surfaced by snapshots()/history()
            "clone_source": {"path": self.path, "version": v},
        }
        clone = VersionedTable(
            self.spark,
            dest_path,
            record_cdf=self._record_cdf,
            cdf_keys=self._cdf_keys or None,
        )
        if clone._versions():
            raise ValueError(f"clone destination {dest_path} is not empty")
        os.makedirs(clone._manifest_dir, exist_ok=True)
        token = uuid.uuid4().hex[:8]
        # a large source stays chunked in the clone — the clone of a
        # 10^6-file table must not regress to a monolithic version JSON
        clone._attach_file_stats(
            entry, files, 1, token, manifest_dir=clone._manifest_dir
        )
        tmp = os.path.join(clone._manifest_dir, f".v1.{token}.json.tmp")
        with open(tmp, "w") as f:
            json.dump(entry, f)
        try:
            os.link(tmp, os.path.join(clone._manifest_dir, "v1.json"))
        except FileExistsError:
            raise CommitConflict(f"lost clone race at {dest_path}")
        finally:
            os.unlink(tmp)
        return clone

    def _logical_columns(self, entry: dict) -> list[str]:
        """The version's visible schema, resolved from one data file's
        footer + the mapping — no Spark job."""
        import pyarrow.parquet as pq

        dirs = [*entry.get("base_dirs", []), entry["data_dir"]]
        for d in dirs:
            for root, _dirs, names in os.walk(os.path.join(self.path, d)):
                for f in sorted(names):
                    if f.endswith(".parquet"):
                        phys = pq.read_schema(os.path.join(root, f)).names
                        drops = set(entry.get("column_drops", []))
                        ren = entry.get("column_renames", {})
                        return [
                            ren.get(c, c)
                            for c in phys
                            if c not in drops
                        ] + list(entry.get("partition_by") or [])
        return []


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
    if table.read() is None:
        raise ValueError("cannot compact an empty table")
    # Compaction changes FILE sizing, not the snapshot's logical layout:
    # a hive-partitioned snapshot stays partitioned the same way (its
    # files are right-sized within each partition directory), and a
    # hidden-partitioned snapshot re-derives its transform column.
    entry = table._manifest(table.current_version())
    layout = entry.get("partition_by")
    spec = entry.get("hidden_partition")
    from pyspark.sql import functions as F

    def rebuild(cur):
        if spec:
            cur = cur.withColumn(spec["name"], _hidden_partition_col(spec))
        return cur.repartition(target_partitions)

    return table._commit_with_retry(
        rebuild, "compact",
        partition_by=layout,
        hidden_partition=spec,
        # a compaction changes ZERO rows: record an EMPTY delta so a
        # record_cdf table's changes_feed spans maintenance commits
        cdf_build=lambda cur: cur.limit(0).withColumn(
            "_change_type", F.lit("insert")
        ),
    )


class LakehouseTransaction:
    """Multi-table ATOMIC transaction: commit writes to N tables together
    or not at all — the catalog-level ACID leg single-table optimistic
    commits can't give (Iceberg gets this from a catalog/Nessie commit;
    Delta from a shared commit coordinator). Same recipe here, reduced to
    one filesystem primitive:

    1. **Prepare** (per ``append``/``overwrite``/``replace`` call): the
       table stages its snapshot data AND CAS-links its next-version
       manifest carrying ``pending_txn_marker`` — the version slot is
       CLAIMED (no other writer can take it) but INVISIBLE (readers skip
       a pending tail whose marker doesn't exist). A lost slot race
       aborts the whole transaction.
    2. **Commit point** — ONE atomic ``os.link`` of
       ``<txn_root>/<tid>.committed.json`` (object stores: put-if-absent).
       Before it exists no table shows its staged version; the instant it
       exists every staged version is durable and visible.
    3. **Publish**: pending manifests are finalized eagerly, and — the
       crash-safety half — LAZILY by whichever reader first meets a
       committed pending tail (`_versions` rolls it forward). A crash
       between 2 and 3 therefore publishes BOTH tables anyway.

    Abort (explicit, or via the context manager on error) links
    ``<tid>.aborted.json``; staged data is removed and any claim that
    survives a crashed abort is cleared by the next writer that wants the
    slot (``_clear_aborted_claim``). A coordinator crash BEFORE the
    commit marker leaves in-flight claims that block their tables'
    writers (never readers); :func:`recover_stale_txns` resolves them the
    way 2PC recovery must — presume abort.

    Scale note: everything here is O(1) driver-side metadata (one staged
    manifest per table + one marker file); the data writes are the same
    distributed snapshot writes the single-table commits do.
    """

    def __init__(self, txn_root: str):
        os.makedirs(txn_root, exist_ok=True)
        self.txn_root = txn_root
        self.tid = f"txn-{int(time.time() * 1000)}-{uuid.uuid4().hex[:8]}"
        self._marker_base = os.path.join(txn_root, self.tid)
        self._staged: list[tuple[VersionedTable, int]] = []
        self._done = False
        # begin record: the durable fact that this tid exists, so a
        # coordinator crash during prepare leaves something for
        # recover_stale_txns to find and presume-abort
        with open(f"{self._marker_base}.begin.json", "w") as f:
            json.dump({"tid": self.tid, "begun_at": time.time()}, f)

    # ------------------------------------------------------------ prepare

    def _stage(
        self,
        table: VersionedTable,
        op: str,
        build,
        txn: tuple[str, int] | None = None,
    ) -> int:
        if self._done:
            raise RuntimeError(f"transaction {self.tid} already finished")
        parent = table.current_version()
        if txn is not None:
            # per-writer watermark (Delta's txn action), checked at stage
            # time: a replayed batch no-ops for this table. Watermarks
            # commit atomically WITH the transaction, so a replay skips
            # every table of the original txn consistently.
            last = table._txn_state(parent).get(txn[0])
            if last is not None and int(last) >= txn[1]:
                return parent
        cur = table.read() if parent else None
        try:
            v = table._try_commit(
                build(cur),
                op,
                parent,
                txn=None if txn is None else {txn[0]: txn[1]},
                pending_txn_marker=self._marker_base,
            )
        except CommitConflict:
            self.abort()
            raise
        self._staged.append((table, v))
        return v

    def append(
        self,
        table: VersionedTable,
        df: DataFrame,
        txn: tuple[str, int] | None = None,
    ) -> int:
        return self._stage(
            table,
            "append",
            lambda cur: df if cur is None else cur.unionByName(df),
            txn=txn,
        )

    def overwrite(
        self,
        table: VersionedTable,
        df: DataFrame,
        txn: tuple[str, int] | None = None,
    ) -> int:
        return self._stage(table, "overwrite", lambda cur: df, txn=txn)

    def merge(
        self,
        table: VersionedTable,
        updates: DataFrame,
        keys: list[str],
        txn: tuple[str, int] | None = None,
    ) -> int:
        """Upsert ``updates`` into ``table`` inside the transaction —
        MERGE's snapshot derives from the table's current version at
        stage time; the version-slot claim makes that read stable until
        the commit point (any concurrent writer conflicts on the slot,
        so a staged merge can never be silently based on a stale
        snapshot)."""
        return self._stage(
            table,
            "merge",
            lambda cur: updates if cur is None else merge_upsert(cur, updates, keys),
            txn=txn,
        )

    # ----------------------------------------------------- commit / abort

    def _link_marker(self, kind: str, payload: dict) -> None:
        tmp = f"{self._marker_base}.{kind}.tmp"
        with open(tmp, "w") as f:
            json.dump(payload, f)
        try:
            os.link(tmp, f"{self._marker_base}.{kind}.json")
        finally:
            os.unlink(tmp)

    def commit(self) -> None:
        if self._done:
            raise RuntimeError(f"transaction {self.tid} already finished")
        # Presume-abort fencing: recover_stale_txns (or a crashed abort)
        # may already have written our aborted marker. Linking the
        # committed marker anyway would leave BOTH markers — readers
        # (_versions) treat the pending tail as committed while
        # _clear_aborted_claim sees only the aborted marker, so a
        # concurrent writer could rmtree a version readers already
        # served. Refuse instead: the txn is dead, its claims clearable.
        if os.path.exists(f"{self._marker_base}.aborted.json"):
            self._done = True
            for t, v in self._staged:
                t._clear_aborted_claim(v)
            raise CommitConflict(
                f"transaction {self.tid} was aborted (presume-abort "
                "recovery or a crashed abort); cannot commit"
            )
        self._done = True
        self._link_marker(
            "committed",
            {
                "tid": self.tid,
                "committed_at": time.time(),
                "tables": [{"path": t.path, "version": v} for t, v in self._staged],
            },
        )  # <-- THE commit point: all staged versions become visible here
        for t, v in self._staged:  # eager publish; lazy roll-forward backs it up
            t._finalize_pending(v)

    def abort(self) -> None:
        if self._done:
            return
        self._done = True
        self._link_marker("aborted", {"tid": self.tid, "aborted_at": time.time()})
        for t, v in self._staged:
            t._clear_aborted_claim(v)

    def __enter__(self) -> "LakehouseTransaction":
        return self

    def __exit__(self, exc_type, exc, tb) -> None:
        if exc_type is None:
            self.commit()
        else:
            self.abort()


def recover_stale_txns(txn_root: str, max_age_s: float = 3600.0) -> list[str]:
    """2PC recovery (presume-abort): any transaction id in ``txn_root``
    with NO committed/aborted marker older than ``max_age_s`` gets an
    aborted marker, unblocking the version slots its claims hold. Run it
    like VACUUM — from a maintenance job, with an age comfortably above
    the longest legitimate prepare phase."""
    now = time.time()
    resolved = []
    seen: dict[str, list[str]] = {}
    for f in os.listdir(txn_root):
        base = f.split(".", 1)[0]
        seen.setdefault(base, []).append(f)
    for tid, files in seen.items():
        if any(f.endswith((".committed.json", ".aborted.json")) for f in files):
            continue
        ages = [now - os.path.getmtime(os.path.join(txn_root, f)) for f in files]
        if ages and min(ages) > max_age_s:
            tmp = os.path.join(txn_root, f"{tid}.aborted.tmp")
            with open(tmp, "w") as fh:
                json.dump({"tid": tid, "aborted_at": now, "recovered": True}, fh)
            try:
                os.link(tmp, os.path.join(txn_root, f"{tid}.aborted.json"))
            except FileExistsError:
                pass
            finally:
                os.unlink(tmp)
            resolved.append(tid)
    return resolved
