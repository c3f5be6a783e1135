"""Structured Streaming over the daily-arrival pattern (SURVEY §2.8).

The reference ingests per-date file drops in a batch loop
(``/root/reference/s3_bucket.py:43-58``); Structured Streaming models the
same pipeline continuously: a file source watches the directory, new files
become micro-batches, windowed aggregations maintain state, watermarks bound
late data (the correction file ``orders_2024-06-06-Updated.csv`` IS late
data), and ``foreachBatch`` applies MERGE per micro-batch (T6).

Execution discipline for verification: every job here can run with
``Trigger.AvailableNow`` — process everything currently in the source as a
real stream (state store, incremental micro-batches), then stop. The result
lands in an in-memory sink table and is compared against the *batch* run of
the same logic — the batch≡streaming equivalence oracle (SURVEY §5.6).

At scale: file-source streams list directories incrementally
(``maxFilesPerTrigger``), stateful aggs shard state by key across executors
(RocksDB state store in prod), and watermarks bound state size — none of
which changes the declarative query below.
"""

from __future__ import annotations

import itertools
import os
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

_sink_counter = itertools.count()

# Known system locations shipping a pure-Python ``google.protobuf`` (the
# gcloud SDK bundles one). Spark 4's typed-state lane
# (transformWithStateInPandas) speaks protobuf between the Python worker
# and the JVM state server; when the package isn't pip-installed, a
# discovered copy activates the lane — no install, no vendoring.
_PROTOBUF_CANDIDATE_DIRS = (
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
)


def bootstrap_protobuf_env() -> bool:
    """Call BEFORE the first SparkSession: export the discovered
    protobuf location (and the version-check escape hatch) into this
    process's environment so the JVM — and every python runner the JVM
    spawns, including transformWithState's long-lived driver worker —
    inherits them. Returns True iff a protobuf became available. No-op
    when the package is properly installed."""
    import importlib
    import sys

    os.environ.setdefault("TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK", "true")
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        pass
    for cand in _PROTOBUF_CANDIDATE_DIRS:
        if not os.path.isdir(os.path.join(cand, "google", "protobuf")):
            continue
        sys.path.append(cand)
        importlib.invalidate_caches()
        try:
            from google.protobuf import descriptor  # noqa: F401
        except ImportError:
            sys.path.remove(cand)
            continue
        pp = os.environ.get("PYTHONPATH", "")
        if cand not in pp.split(os.pathsep):
            os.environ["PYTHONPATH"] = f"{pp}{os.pathsep}{cand}" if pp else cand
        return True
    return False


def ensure_protobuf(spark: SparkSession | None = None) -> bool:
    """True iff the Spark typed-state (transformWithStateInPandas)
    protobuf protocol is usable END-TO-END on this session: the DRIVER
    can import google.protobuf + the StateMessage gencode, and the
    JVM-spawned python runners will see the same package. The runners
    inherit the JVM's environment — fixed at JVM launch — so when
    protobuf comes from a discovered system copy (the gcloud SDK bundles
    a pure-Python one), :func:`bootstrap_protobuf_env` must have exported
    PYTHONPATH before the session was built; a session whose JVM missed
    it reports False and callers stay on the applyInPandasWithState
    lane. A real deployment pip-installs protobuf and both checks
    reduce to imports.

    The discovered copy is runtime 6.32 against Spark's 6.33 gencode —
    one minor behind, wire-identical; protobuf's own escape hatch
    (``TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK``) covers the gap."""
    if not bootstrap_protobuf_env():
        return False
    try:
        # the gencode is versioned; prove it loads under this runtime
        import pyspark.sql.streaming.proto.StateMessage_pb2  # noqa: F401
        from google.protobuf import descriptor
    except Exception:
        return False
    if spark is None:
        return True
    installed = "google-cloud-sdk" not in (descriptor.__file__ or "")
    if installed:
        return True  # site-packages: every python process sees it
    # discovered copy: the runner needs BOTH vars from the JVM's env
    jvm_env = spark._jvm.System.getenv  # noqa: SLF001
    jvm_pp = jvm_env("PYTHONPATH") or ""
    path_ok = any(
        os.path.isdir(os.path.join(p, "google", "protobuf"))
        for p in jvm_pp.split(os.pathsep)
        if p
    )
    return path_ok and jvm_env("TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK") is not None

_INTERVAL_US = {
    "microsecond": 1,
    "millisecond": 1_000,
    "second": 1_000_000,
    "minute": 60 * 1_000_000,
    "hour": 3_600 * 1_000_000,
    "day": 86_400 * 1_000_000,
    "week": 7 * 86_400 * 1_000_000,
}


def parse_interval_us(interval: str) -> int:
    """Parse a Spark-style interval string ("30 minutes", "1 hour",
    "90 seconds", "1 hour 30 minutes") to microseconds — the subset of
    CalendarInterval syntax a session gap can use (fixed-length units
    only; months/years are calendar-dependent and rejected, as
    ``session_window`` itself rejects them for gaps)."""
    import re

    total, matched = 0, 0
    for num, unit in re.findall(r"(\d+)\s*([a-zA-Z]+)", interval.strip()):
        u = unit.lower().rstrip("s")
        if u not in _INTERVAL_US:
            raise ValueError(
                f"unsupported interval unit {unit!r} in {interval!r}; "
                f"supported: {sorted(_INTERVAL_US)}"
            )
        total += int(num) * _INTERVAL_US[u]
        matched += 1
    if not matched or total <= 0:
        raise ValueError(f"cannot parse interval {interval!r}")
    return total


@contextmanager
def _stream_shuffle(spark: SparkSession, shuffle: int | None = None):
    """Run a stream with a small shuffle-partition count, restoring the
    session setting afterwards.

    Stateful operators instantiate one state store (+ checkpoint dir) per
    shuffle partition, so at test scale the per-partition setup dominates
    the actual work; a handful of partitions cuts stream wall time ~2-3×.
    ``shuffle`` lets a job with known-small key cardinality go lower
    still. On a real cluster this knob is sized to executor count — the
    override env var is the same one."""
    n = str(shuffle) if shuffle is not None else os.environ.get("SPARK_GRAFT_STREAM_SHUFFLE", "8")
    key = "spark.sql.shuffle.partitions"
    old = spark.conf.get(key)
    spark.conf.set(key, n)
    try:
        yield
    finally:
        spark.conf.set(key, old)


def write_single_parquet(df: DataFrame, dest: str) -> None:
    """Write ``df`` as exactly ONE parquet file at ``dest`` — the unit of
    arrival for file-stream sources (one file = one micro-batch under
    maxFilesPerTrigger=1)."""
    import glob
    import os
    import shutil
    import tempfile

    stage = tempfile.mkdtemp(prefix="rdl_onefile_")
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
    shutil.move(part, dest)
    shutil.rmtree(stage, ignore_errors=True)


def stage_chunks(chunks: list[DataFrame], dest_dir: str, name: str = "batch") -> list[str]:
    """Stage N same-schema arrival chunks as N single parquet files with
    increasing mtimes — in ONE Spark job instead of N serial
    ``coalesce(1)`` writes (r15, VERDICT r14 item 3; the t9/ewma
    one-job staging generalized). Chunks are tagged, unioned, and written
    via dynamic ``partitionBy``: ``repartition("__c")`` puts each chunk
    wholly in one task, so each partition directory holds exactly one
    part file — the same bytes-per-file and mtime ordering the serial
    writes produced. Fails loudly on an empty chunk (ADVICE r14)."""
    import functools
    import glob
    import os
    import shutil
    import tempfile

    tagged = [df.withColumn("__c", F.lit(i)) for i, df in enumerate(chunks)]
    u = functools.reduce(lambda a, b: a.unionByName(b), tagged)
    stage = tempfile.mkdtemp(prefix="rdl_stage_chunks_")
    u.repartition("__c").write.mode("overwrite").partitionBy("__c").parquet(stage)
    paths = []
    for i in range(len(chunks)):
        found = glob.glob(os.path.join(stage, f"__c={i}", "part-*.parquet"))
        if not found:
            raise RuntimeError(f"staged arrival chunk {i} is empty")
        dest = os.path.join(dest_dir, f"{name}{i}.parquet")
        shutil.move(found[0], dest)
        os.utime(dest, (1_000_000_000 + i * 60, 1_000_000_000 + i * 60))
        paths.append(dest)
    shutil.rmtree(stage, ignore_errors=True)
    return paths


def read_file_stream(spark: SparkSession, path: str, schema: StructType, fmt: str = "parquet") -> DataFrame:
    """T1: file-source stream — watch ``path``, ingest files as they appear.
    Schema must be explicit (file streams don't infer)."""
    return spark.readStream.schema(schema).format(fmt).load(path)


def run_to_memory(
    df: DataFrame,
    output_mode: str = "complete",
    name: str | None = None,
    return_query: bool = False,
    shuffle: int | None = None,
):
    """Execute a streaming DataFrame with AvailableNow into a memory sink;
    returns the sink table name (unique per call, so re-runs don't clash).
    With ``return_query`` also returns the terminated StreamingQuery, whose
    ``recentProgress`` carries per-batch state-store metrics."""
    sink = name or f"stream_sink_{next(_sink_counter)}"
    with _stream_shuffle(df.sparkSession, shuffle):
        q = (
            df.writeStream.format("memory")
            .queryName(sink)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return (sink, q) if return_query else sink


def run_foreach_batch(
    df: DataFrame, fn, output_mode: str = "update", checkpoint: str | None = None
):
    """T6 harness: run a stream through ``foreachBatch(fn)`` to completion.
    ``fn(batch_df, batch_id)`` applies the per-micro-batch action (MERGE,
    idempotent upsert into a sink table, ...).

    With ``checkpoint``, offsets persist across runs: a NEW invocation
    over the same source resumes after the last committed batch (restart
    recovery), and batch ids keep increasing — pair with the sink's
    txn=(writer, batch_id) guard for end-to-end exactly-once.

    Returns the (terminated) StreamingQuery — its ``recentProgress``
    carries per-batch state-store metrics (rows updated / removed /
    dropped-by-watermark), the observability surface for bounded state."""
    with _stream_shuffle(df.sparkSession):
        writer = df.writeStream.foreachBatch(fn).outputMode(output_mode)
        if checkpoint is not None:
            writer = writer.option("checkpointLocation", checkpoint)
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
    return q


def state_metrics(query) -> dict[str, int]:
    """Sum state-operator metrics across a finished query's progress
    events: rows dropped below the watermark, state rows evicted, and
    total state rows — the numbers that prove state stays bounded.

    ``numRowsTotal`` is a POINT-IN-TIME state size, not a per-batch delta:
    it is taken from the FINAL progress event only, summed across all of
    that event's state operators (a multi-operator query keeps state in
    each). The dropped/removed counters ARE per-batch deltas and sum over
    ``recentProgress`` — which Spark caps at
    ``spark.sql.streaming.numRecentProgressUpdates`` (default 100) events,
    so for streams longer than that the sums are lower bounds; the
    availableNow runs in this package finish in far fewer batches."""
    totals = {"numRowsDroppedByWatermark": 0, "numRowsRemoved": 0, "numRowsTotal": 0}
    progress = list(query.recentProgress)  # StreamingQueryProgress supports []
    for p in progress:
        for op in p["stateOperators"]:
            totals["numRowsDroppedByWatermark"] += op["numRowsDroppedByWatermark"]
            totals["numRowsRemoved"] += op["numRowsRemoved"]
    if progress:
        totals["numRowsTotal"] = sum(
            op["numRowsTotal"] for op in progress[-1]["stateOperators"]
        )
    return totals


def _as_stream_dir(sf_dir: str, table: str) -> str:
    """File-stream sources watch a DIRECTORY (new files = new micro-batches,
    exactly the reference's daily-drop arrival at `s3_bucket.py:43-58`).
    The testdata ships single parquet files, so stage a symlink into a
    scratch dir."""
    import os
    import tempfile

    d = os.path.join(
        tempfile.gettempdir(), "rdl_spark_streams", sf_dir.strip("/").replace("/", "_"), table
    )
    os.makedirs(d, exist_ok=True)
    link = os.path.join(d, f"{table}.parquet")
    if not os.path.exists(link):
        os.symlink(f"{sf_dir}/{table}.parquet", link)
    return d


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical event stream: testdata events as a file-source stream,
    with the nanos→micros timestamp conversion applied stream-side."""
    from ..catalog import normalize_ntz

    spark.conf.set("spark.sql.session.timeZone", "UTC")  # window boundaries ≡ DuckDB naive ts
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = read_file_stream(spark, _as_stream_dir(sf_dir, "events"), raw_schema)
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return normalize_ntz(stream)


def documents_stream_drops(
    spark: SparkSession, sf_dir: str, n_drops: int = 3, stage_dir: str | None = None
) -> DataFrame:
    """The corpus-arrival stream: documents staged as ``n_drops`` parquet
    files (deterministic ``doc_id % n_drops`` split) in a fresh scratch
    dir, read back as a file stream with ``maxFilesPerTrigger=1`` — so a
    corpus-ingest job really processes MULTIPLE micro-batches, the arrival
    pattern of a production crawl (each drop = one crawl dump). Staging is
    per-call (tempdir), so re-runs never double-ingest."""
    import tempfile

    d = stage_dir or tempfile.mkdtemp(prefix="rdl_doc_drops_")
    os.makedirs(d, exist_ok=True)
    batch = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # r15 (verdict item 3): all drops staged in ONE job instead of n_drops
    # serial coalesce(1) writes that each re-scanned the corpus.
    stage_chunks(
        [batch.filter(F.col("doc_id") % n_drops == i) for i in range(n_drops)],
        d,
        name="drop_",
    )
    return (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(d)
    )


def tumbling_agg(stream: DataFrame, window_size: str = "1 hour") -> DataFrame:
    """T2: tumbling-window aggregation (revenue per window per type)."""
    return (
        stream.groupBy(F.window("ts", window_size).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(25,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_agg(stream: DataFrame, window_size: str = "1 hour", slide: str = "15 minutes") -> DataFrame:
    """T3: sliding-window aggregation — each event lands in
    window/slide overlapping windows."""
    return (
        stream.groupBy(F.window("ts", window_size, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )


def session_agg(stream: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """T4: session windows — user activity sessions closed by a 30-min gap."""
    return (
        stream.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def watermarked_dedup(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """T5+T6: watermark + stateful dedup — late duplicates beyond the
    watermark are dropped; state for seen keys is bounded by the watermark
    horizon (the piece that keeps 100 TB streams from unbounded state)."""
    return stream.withWatermark("ts", watermark).dropDuplicates(["event_id"])


def stateful_user_counter(stream: DataFrame):
    """Custom stateful operator via applyInPandasWithState (SURVEY §2.8
    mandate): a per-user running (event_count, total_value) state machine —
    the shape for custom session logic, CDC folding, or feature windows
    that `window()`/`session_window()` can't express.

    State (count, total) lives in the state store sharded by user_id; each
    micro-batch folds its rows in and emits the updated row per key. The
    final emission per key therefore equals the global batch aggregate —
    which is exactly the oracle used in queries/streaming.py.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n_events", LongType()),
            StructField("total_value", DoubleType()),
        ]
    )
    state_schema = StructType(
        [StructField("n", LongType()), StructField("tot", DoubleType())]
    )

    def fold(key, pdf_iter, state):
        import pandas as pd

        n, tot = state.get if state.exists else (0, 0.0)
        for pdf in pdf_iter:
            n += len(pdf)
            tot += float(pdf["value"].sum())
        state.update((n, tot))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "total_value": [tot]})

    return stream.groupBy("user_id").applyInPandasWithState(
        fold, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def ewma_stateful(stream: DataFrame, alpha: float = 0.3, key_col: str = "pri"):
    """Unbounded-series EWMA via applyInPandasWithState (the alternative
    the bounded array-fold in queries/analytics.py names): state per key =
    (last_ewma, last_day) — O(1) regardless of series length, so the
    recurrence never materializes history (the array fold's O(series²)
    concat is gone and a 10-year daily series costs the same per batch as
    a 10-day one).

    Input stream rows: (key, day, rev), each key's rows arriving in day
    order across micro-batches. Emits (key, day, rev, ewma) exactly once
    per row (append). The fold uses literal ``alpha`` and ``1-alpha``
    double constants in fixed order, so results are bit-identical to the
    batch fold / recursive-CTE oracle."""
    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import (
        DateType,
        DoubleType,
        StringType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField(key_col, StringType()),
            StructField("day", DateType()),
            StructField("rev", DoubleType()),
            StructField("ewma", DoubleType()),
        ]
    )
    state_schema = StructType(
        [StructField("last_ewma", DoubleType()), StructField("last_day", DateType())]
    )
    beta = 1.0 - alpha  # bit-equal to the oracle's 0.7 literal for alpha=0.3

    def fold(key, pdf_iter, state):
        import pandas as pd

        last_ewma, last_day = state.get if state.exists else (None, None)
        # A group's rows within ONE micro-batch can arrive as several
        # unordered Arrow chunks (split at arrow.maxRecordsPerBatch) —
        # concat and sort ONCE before folding, or the recurrence would
        # apply days out of order across chunk boundaries.
        chunks = [pdf for pdf in pdf_iter]
        pdf = pd.concat(chunks) if chunks else pd.DataFrame(columns=[key_col, "day", "rev"])
        pdf = pdf.sort_values("day")
        ewmas = []
        for rev in pdf["rev"]:
            rev = float(rev)
            last_ewma = rev if last_ewma is None else alpha * rev + beta * last_ewma
            ewmas.append(last_ewma)
        pdf = pdf.assign(ewma=ewmas) if len(pdf) else pdf.assign(ewma=[])
        if len(pdf):
            last_day = pdf["day"].iloc[-1]
        state.update((last_ewma, last_day))
        yield pdf[[key_col, "day", "rev", "ewma"]]

    return stream.groupBy(key_col).applyInPandasWithState(
        fold, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def stream_static_join(stream: DataFrame, static_dim: DataFrame, on: str) -> DataFrame:
    """T-extension: stream⋈static join — each micro-batch joins against the
    (broadcastable) dimension snapshot; no state store involved. The
    standard enrichment shape (events × user/product dims)."""
    return stream.join(F.broadcast(static_dim), on)


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    within: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """T-extension: stream⋈stream interval join. Both sides are
    watermarked (bounds the join state) and matched on key + a time band
    — right events within [left_ts - within, left_ts]. The state store
    holds only rows younger than watermark+within: bounded at any scale.

    ``how='left_outer'`` adds the null-padded non-matches: a left row is
    emitted unmatched only once the global watermark proves no matching
    right row can still arrive (left_ts + within < watermark) — so a
    finite stream must advance the watermark past its own tail (an
    advancer batch) to flush trailing outer rows.
    """
    l = left.withWatermark(left_ts, watermark).alias("l")
    r = right.withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{on}") == F.col(f"r.{on}"))
        & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}") - F.expr(f"INTERVAL {within}"))
    )
    return l.join(r, cond, how)


def session_close_stateful(stream: DataFrame, gap: str = "30 minutes"):
    """Custom sessionizer with EVENT-TIME TIMERS — the timeout shape
    `session_window` (t4) hides: per-key state holds the OPEN session
    only; gaps inside a micro-batch close sessions immediately (emitted
    in that batch), and the trailing open session is closed by
    ``GroupStateTimeout.EventTimeTimeout`` when the watermark proves no
    more events can join it (``state.hasTimedOut`` fires, the session
    emits once, state is removed). State per key is O(1) — three longs —
    regardless of session length or history, and every eviction is
    timer-driven, so a perpetual 100 TB clickstream holds exactly one
    open session per active user. Emits (user_id, session_start,
    session_end = last + gap, n_events), append-mode exactly-once per
    closed session — same output contract as t4's session_window."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
        TimestampType,
    )

    gap_us = parse_interval_us(gap)
    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("session_start", TimestampType()),
            StructField("session_end", TimestampType()),
            StructField("n_events", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("start_us", LongType()),
            StructField("last_us", LongType()),
            StructField("n", LongType()),
        ]
    )

    # deliberately unannotated: partial type hints trip pyspark's
    # eval-type inference warning, and this callback is not hint-
    # dispatched (applyInPandasWithState passes state positionally)
    def emit(key, sessions):
        return pd.DataFrame(
            {
                "user_id": key[0],
                "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in sessions],
                "session_end": [pd.Timestamp(l + gap_us, unit="us") for _, l, _ in sessions],
                "n_events": [n for *_, n in sessions],
            }
        )

    def fold(key, pdf_iter, state):
        if state.hasTimedOut:
            closed = tuple(state.get)
            state.remove()
            yield emit(key, [closed])
            return
        chunks = [p for p in pdf_iter]
        pdf = pd.concat(chunks).sort_values("ts")
        cur = tuple(state.get) if state.exists else None
        closed = []
        for t in pdf["ts"]:
            us = int(pd.Timestamp(t).value // 1000)
            if cur is None:
                cur = (us, us, 1)
            elif us - cur[1] > gap_us:
                closed.append(cur)
                cur = (us, us, 1)
            else:
                cur = (cur[0], us, cur[2] + 1)
        state.update(cur)
        # close the open session when the watermark passes last + gap
        state.setTimeoutTimestamp(cur[1] // 1000 + gap_us // 1000)
        if closed:
            yield emit(key, closed)

    return stream.groupBy("user_id").applyInPandasWithState(
        fold, out_schema, state_schema, "append", GroupStateTimeout.EventTimeTimeout
    )


def streaming_packer(doc_stream: DataFrame, bin_tokens: int = 512):
    """Continuous sequence packing (the streaming form of
    l7_sequence_packing's concat-then-chunk rule): per shard, a single
    running token offset persists across micro-batches; each arriving
    document is assigned the training bin its first token falls in,
    exactly once, in ARRIVAL order. State per shard is ONE long — a
    perpetual crawl packs forever without rereading anything. Expects
    (shard, doc_id, n_tokens) rows — tokenization stays JVM-side
    upstream; the Python fold only adds a cumulative sum."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType(
        [
            StructField("shard", LongType()),
            StructField("doc_id", LongType()),
            StructField("n_tokens", LongType()),
            StructField("bin_id", LongType()),
        ]
    )
    state_schema = StructType([StructField("offset", LongType())])

    def fold(key, pdf_iter, state):
        (offset,) = state.get if state.exists else (0,)
        chunks = [p for p in pdf_iter]
        pdf = pd.concat(chunks).sort_values("doc_id")
        starts = pdf["n_tokens"].cumsum().shift(fill_value=0) + offset
        offset = int(offset + pdf["n_tokens"].sum())
        state.update((offset,))
        yield pd.DataFrame(
            {
                "shard": key[0],
                "doc_id": pdf["doc_id"].to_numpy(),
                "n_tokens": pdf["n_tokens"].to_numpy(),
                "bin_id": (starts // bin_tokens).astype("int64").to_numpy(),
            }
        )

    return doc_stream.groupBy("shard").applyInPandasWithState(
        fold, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def _require_rocksdb_state_store(spark: SparkSession) -> str | None:
    """transformWithState needs a state store with column families —
    only RocksDB has them (HDFSBacked rejects the query at start). The
    conf is read when a stream STARTS, so setting it here covers streams
    the caller starts off the returned DataFrame; already-RocksDB
    sessions are untouched.

    SESSION-WIDE SIDE EFFECT: the provider conf applies to every stream
    subsequently started on this session — a pre-existing HDFS-backed
    CHECKPOINTED query restarted afterwards would fail on the provider
    change. Returns the PRIOR value (None if unset) so callers can
    restore it with :func:`restore_state_store_provider` once their
    stream has started; the tws-lane builders (`running_user_totals`,
    `idle_user_flush`) document this contract for their callers."""
    key = "spark.sql.streaming.stateStore.providerClass"
    rocks = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    prior = spark.conf.get(key, None)
    if prior != rocks:
        spark.conf.set(key, rocks)
    return prior


def restore_state_store_provider(spark: SparkSession, prior: str | None) -> None:
    """Undo :func:`_require_rocksdb_state_store` AFTER the stream whose
    build required RocksDB has started (the conf is captured at stream
    start, so restoring then is safe for the running query and protects
    any HDFS-backed streams started later on the same session)."""
    key = "spark.sql.streaming.stateStore.providerClass"
    if prior is None:
        spark.conf.unset(key)
    else:
        spark.conf.set(key, prior)


_TOTALS_OUT = "user_id bigint, n_events bigint, total_cents bigint"


def _fold_totals(prev: tuple[int, int] | None, pdfs) -> tuple[int, int]:
    """Shared accumulator for both stateful APIs: exact integer cents
    (float accumulation would make the result depend on arrival slicing;
    cents make stream ≡ batch bit-equal)."""
    n, cents = prev or (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        cents += int((pdf["value"] * 100).round().astype("int64").sum())
    return n, cents


def running_user_totals(stream: DataFrame, force_api: str | None = None) -> DataFrame:
    """Per-user RUNNING totals, update-mode emission per micro-batch.
    State per user is two longs (count + integer-cents sum), so a
    perpetual clickstream holds O(active users) state regardless of
    history. Emits (user_id, n_events, total_cents) for every user seen
    in each micro-batch, cumulative as of that batch.

    Two implementations, same semantics (the path-equivalence the t23
    oracle pins is API-independent):

    - ``transformWithStateInPandas`` (Spark 4 StatefulProcessor — typed
      ValueState declared against a schema). Its state-server protocol
      needs ``protobuf``; :func:`ensure_protobuf` activates it from a
      discovered system copy (shipped to workers via addPyFile) when the
      package isn't installed.
    - ``applyInPandasWithState`` fallback — the older arbitrary-state
      API; identical fold, identical output.

    The tws path sets the SESSION-WIDE RocksDB state-store provider conf
    (required for column families) and leaves it set so the stream the
    caller starts off this DataFrame picks it up; callers co-hosting
    HDFS-backed checkpointed streams on the same session should call
    :func:`restore_state_store_provider` after their stream starts.
    """
    import pandas as pd

    api = force_api
    if api is None:
        api = "tws" if ensure_protobuf(stream.sparkSession) else "apiws"
    elif api == "tws":
        ensure_protobuf(stream.sparkSession)

    if api == "tws":
        _require_rocksdb_state_store(stream.sparkSession)
        from pyspark.sql.streaming.stateful_processor import (
            StatefulProcessor,
            StatefulProcessorHandle,
        )

        class RunningTotals(StatefulProcessor):
            def init(self, handle: StatefulProcessorHandle) -> None:
                self._tot = handle.getValueState("tot", "n bigint, cents bigint")

            def handleInputRows(self, key, rows, timer_values):
                prev = self._tot.get()
                n, cents = _fold_totals(
                    None if prev is None else (int(prev[0]), int(prev[1])), rows
                )
                self._tot.update((n, cents))
                yield pd.DataFrame(
                    {"user_id": [key[0]], "n_events": [n], "total_cents": [cents]}
                )

            def close(self) -> None:
                pass

        return stream.groupBy("user_id").transformWithStateInPandas(
            RunningTotals(),
            outputStructType=_TOTALS_OUT,
            outputMode="Update",
            timeMode="None",
        )

    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import LongType, StructField, StructType as ST

    state_schema = ST([StructField("n", LongType()), StructField("cents", LongType())])

    def fold(key, pdfs, state):
        prev = tuple(state.get) if state.exists else None
        n, cents = _fold_totals(prev, pdfs)
        state.update((n, cents))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_cents": [cents]}
        )

    return stream.groupBy("user_id").applyInPandasWithState(
        fold, _TOTALS_OUT, state_schema, "update", GroupStateTimeout.NoTimeout
    )


_IDLE_OUT = "user_id bigint, n_events bigint, last_ms bigint"


def idle_user_flush(
    stream: DataFrame,
    gap_ms: int = 600_000,
    delay: str = "1 second",
    force_api: str | None = None,
) -> DataFrame:
    """Timer-driven state EXPIRY (the TTL drill): per-user running event
    count; a user emits exactly ONE row — when the EVENT-TIME watermark
    passes their last event + ``gap_ms`` — and their state is cleared.
    Nothing emits on input, only on expiry, so state is provably bounded
    by the timer discipline (the watermark, not the operator, decides
    retention). Event-time timers keep the drill DETERMINISTIC: given
    the same micro-batch sequence, both lanes fire identically — no
    wall-clock in the semantics.

    Lanes (same contract, pinned equal by the test):

    - ``transformWithStateInPandas`` + ``timeMode="EventTime"``: one
      live registered timer per key (re-registered forward on each
      event), ``handleExpiredTimer`` emits + clears.
    - ``applyInPandasWithState`` + ``GroupStateTimeout.EventTimeTimeout``:
      ``setTimeoutTimestamp(last + gap)``, the timed-out invocation
      emits + removes.

    ``stream`` needs an event-time column ``ts`` (timestamp); a final
    watermark-advancer batch flushes sessions pending at end-of-input
    (the t14 pattern).

    The tws path sets the SESSION-WIDE RocksDB state-store provider conf
    and leaves it set (the conf is read at stream start); callers
    co-hosting HDFS-backed checkpointed streams should call
    :func:`restore_state_store_provider` after their stream starts."""
    import pandas as pd

    api = force_api
    if api is None:
        api = "tws" if ensure_protobuf(stream.sparkSession) else "apiws"
    elif api == "tws":
        ensure_protobuf(stream.sparkSession)

    wm = stream.withWatermark("ts", delay).select(
        "user_id",
        # integer division: exact at any magnitude (a double /1000 would
        # truncate sub-ms micros through float rounding)
        F.expr("unix_micros(ts) DIV 1000").alias("ts_ms"),
        "ts",
    )

    if api == "tws":
        _require_rocksdb_state_store(stream.sparkSession)
        from pyspark.sql.streaming.stateful_processor import (
            StatefulProcessor,
            StatefulProcessorHandle,
        )

        gap = gap_ms

        class IdleFlush(StatefulProcessor):
            def init(self, handle: StatefulProcessorHandle) -> None:
                self._h = handle
                self._st = handle.getValueState("st", "n bigint, last_ms bigint")

            def handleInputRows(self, key, rows, timer_values):
                prev = self._st.get()
                n, last = (0, 0) if prev is None else (int(prev[0]), int(prev[1]))
                for pdf in rows:
                    n += len(pdf)
                    last = max(last, int(pdf["ts_ms"].max()))
                # one live timer per key: slide it forward to last + gap
                for t in self._h.listTimers():
                    self._h.deleteTimer(t)
                self._h.registerTimer(last + gap)
                self._st.update((n, last))
                return iter(())  # emission happens ONLY on expiry

            def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):  # noqa: N803 — pyspark invokes with camelCase kwargs
                st = self._st.get()
                if st is not None:
                    self._st.clear()
                    yield pd.DataFrame(
                        {
                            "user_id": [key[0]],
                            "n_events": [int(st[0])],
                            "last_ms": [int(st[1])],
                        }
                    )

            def close(self) -> None:
                pass

        return wm.groupBy("user_id").transformWithStateInPandas(
            IdleFlush(),
            outputStructType=_IDLE_OUT,
            outputMode="Append",
            timeMode="EventTime",
        )

    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import LongType, StructField, StructType as ST

    state_schema = ST([StructField("n", LongType()), StructField("last_ms", LongType())])

    def fold(key, pdfs, state):
        if state.hasTimedOut:
            n, last = state.get
            state.remove()
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "last_ms": [last]}
            )
            return
        prev = tuple(state.get) if state.exists else (0, 0)
        n, last = int(prev[0]), int(prev[1])
        for pdf in pdfs:
            n += len(pdf)
            last = max(last, int(pdf["ts_ms"].max()))
        state.update((n, last))
        state.setTimeoutTimestamp(last + gap_ms)
        return
        yield  # pragma: no cover — makes fold a generator on every path

    return wm.groupBy("user_id").applyInPandasWithState(
        fold, _IDLE_OUT, state_schema, "append", GroupStateTimeout.EventTimeTimeout
    )
