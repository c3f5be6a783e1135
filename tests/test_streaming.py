"""Streaming semantics tests (SURVEY §2.8): late-data admission under
watermarks (T5) and multi-file micro-batch arrival (T1) — the behaviors the
driver's batch-equivalence oracle can't pin."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from retail_datalakehouse_spark.streaming.jobs import (
    read_file_stream,
    run_to_memory,
    tumbling_agg,
    watermarked_dedup,
)


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type", "value"]).coalesce(
        1
    ).write.mode("append").parquet(str(path))


def test_multi_file_arrival_drains_all(spark, tmp_path):
    """T1: two files dropped before start — AvailableNow drains both (the
    daily-drop consolidation the reference does with an upload loop)."""
    d = tmp_path / "stream"
    t0 = datetime(2024, 6, 6, 10, 0, 0)
    _write_batch(spark, d, [(1, t0, 7, "click", 1.0)])
    _write_batch(spark, d, [(2, t0, 7, "click", 2.0), (3, t0, 8, "view", 3.0)])
    schema = spark.read.parquet(str(d)).schema
    stream = read_file_stream(spark, str(d), schema)
    sink = run_to_memory(
        stream.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")), "complete"
    )
    got = {r.event_type: r.n for r in spark.table(sink).collect()}
    assert got == {"click": 2, "view": 1}


def test_watermark_dedup_drops_duplicate_within_horizon(spark, tmp_path):
    """T5/T6: duplicate event_ids inside the watermark horizon are dropped
    by stateful dedup; distinct ids all survive."""
    d = tmp_path / "stream"
    t0 = datetime(2024, 6, 6, 10, 0, 0)
    t1 = datetime(2024, 6, 6, 10, 5, 0)
    rows = [(1, t0, 7, "click", 1.0), (1, t0, 7, "click", 1.0), (2, t1, 7, "view", 2.0)]
    _write_batch(spark, d, rows)
    schema = spark.read.parquet(str(d)).schema
    stream = read_file_stream(spark, str(d), schema)
    sink = run_to_memory(
        watermarked_dedup(stream, "1 hour").select("event_id"), output_mode="append"
    )
    ids = sorted(r.event_id for r in spark.table(sink).collect())
    assert ids == [1, 2]


def test_foreachbatch_merge_state_in_table_log(spark, tmp_path):
    """T6: streaming upsert state lives in a VersionedTable — one MERGE
    version per micro-batch in the manifest log, final state = latest row
    per key across ALL batches (update-if-newer, so an out-of-order later
    batch cannot regress a key)."""
    from retail_datalakehouse_spark.operators.dedup import dedup_keep_first
    from retail_datalakehouse_spark.sources.table_format import VersionedTable
    from retail_datalakehouse_spark.streaming.jobs import run_foreach_batch

    d = tmp_path / "stream"
    t0 = datetime(2024, 6, 6, 10, 0, 0)
    t1 = datetime(2024, 6, 6, 11, 0, 0)
    # file 1: key (7, click) @ t1 value 1.0 — the NEWER row arrives FIRST
    _write_batch(spark, d, [(1, t1, 7, "click", 1.0)])
    # file 2: stale (7, click) @ t0 must NOT win; (8, view) is a new key
    _write_batch(spark, d, [(2, t0, 7, "click", 99.0), (3, t0, 8, "view", 3.0)])
    schema = spark.read.parquet(str(d)).schema
    # maxFilesPerTrigger=1 → each file is its own micro-batch
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(str(d))

    table = VersionedTable(spark, str(tmp_path / "state_tbl"))
    keys = ["user_id", "event_type"]
    order = [F.unix_micros(F.col("ts")).desc(), F.col("event_id").desc()]

    def apply_batch(batch_df, batch_id):
        latest = dedup_keep_first(batch_df, keys=keys, order_by=order)
        table.merge(latest.select("user_id", "event_type", "value", "ts", "event_id"), keys=keys, order_by=order)

    run_foreach_batch(stream, apply_batch, output_mode="append")

    hist = table.history()
    assert len(hist) >= 2, "one MERGE version per micro-batch expected"
    assert all(h["operation"] == "merge" for h in hist)
    final = {(r.user_id, r.event_type): r.value for r in table.read().collect()}
    assert final == {(7, "click"): 1.0, (8, "view"): 3.0}  # stale row lost
    # time travel: the first batch's state is still readable
    v1 = {(r.user_id, r.event_type): r.value for r in table.read_version(hist[0]["version"]).collect()}
    assert v1 == {(7, "click"): 1.0}


def test_tumbling_stream_equals_batch(spark, tmp_path):
    """T2 equivalence on crafted data: streaming tumbling agg ≡ batch
    groupBy(date_trunc) on the same rows."""
    d = tmp_path / "stream"
    rows = [
        (1, datetime(2024, 6, 6, 10, 10), 7, "click", 1.0),
        (2, datetime(2024, 6, 6, 10, 50), 7, "click", 2.0),
        (3, datetime(2024, 6, 6, 11, 5), 8, "view", 4.0),
    ]
    _write_batch(spark, d, rows)
    schema = spark.read.parquet(str(d)).schema
    sink = run_to_memory(tumbling_agg(read_file_stream(spark, str(d), schema)), "complete")
    streamed = {(r.window_start, r.event_type): (r.n_events, r.total_value)
                for r in spark.table(sink).collect()}
    batch = (
        spark.read.parquet(str(d))
        .groupBy(F.date_trunc("hour", "ts").alias("ws"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(F.col("value").cast("decimal(25,2)")).cast("double").alias("tv"))
    )
    expected = {(r.ws, r.event_type): (r.n, r.tv) for r in batch.collect()}
    assert streamed == expected


def test_checkpoint_restart_resumes_without_reprocessing(spark, tmp_path):
    """Restart recovery, end-to-end exactly-once: run 1 processes file A
    into a VersionedTable via foreachBatch MERGE with txn batch ids; a NEW
    stream over the same checkpoint processes ONLY the later file B, and
    replays (same checkpoint, no new data) commit nothing."""
    from retail_datalakehouse_spark.operators.dedup import dedup_keep_first
    from retail_datalakehouse_spark.sources.table_format import VersionedTable
    from retail_datalakehouse_spark.streaming.jobs import run_foreach_batch

    src = tmp_path / "src"
    ckpt = str(tmp_path / "ckpt")
    t0 = datetime(2024, 6, 6, 10, 0, 0)
    t1 = datetime(2024, 6, 6, 11, 0, 0)
    _write_batch(spark, src, [(1, t0, 7, "click", 1.0), (2, t0, 8, "view", 2.0)])

    table = VersionedTable(spark, str(tmp_path / "tbl"))
    keys = ["user_id", "event_type"]
    order = [F.col("ts").desc(), F.col("event_id").desc()]

    def mk_stream():
        schema = spark.read.parquet(str(src)).schema
        return spark.readStream.schema(schema).parquet(str(src))

    def apply_batch(batch_df, batch_id):
        latest = dedup_keep_first(batch_df, keys=keys, order_by=order)
        table.merge(latest, keys=keys, order_by=order, txn=("ckpt_test", batch_id))

    run_foreach_batch(mk_stream(), apply_batch, checkpoint=ckpt)
    v_after_first = table.current_version()
    assert {r.user_id for r in table.read().collect()} == {7, 8}

    # restart with NEW data: only file B processed, batch id advances
    _write_batch(spark, src, [(3, t1, 7, "click", 9.0)])
    run_foreach_batch(mk_stream(), apply_batch, checkpoint=ckpt)
    got = {(r.user_id, r.event_type): r.value for r in table.read().collect()}
    assert got[(7, "click")] == 9.0 and got[(8, "view")] == 2.0

    # restart with NO new data: nothing commits (offsets + txn guard)
    v_before_replay = table.current_version()
    run_foreach_batch(mk_stream(), apply_batch, checkpoint=ckpt)
    assert table.current_version() == v_before_replay
    assert v_before_replay == v_after_first + 1


def test_session_window_state_eviction_and_late_drop(spark, tmp_path):
    """Bounded-state session windows (t4_session_window_bounded shape):
    the watermark must (a) EVICT closed sessions from the state store
    (numRowsRemoved > 0, numRowsTotal stays at open-session count) and
    (b) DROP rows arriving below the watermark (numRowsDroppedByWatermark
    > 0), with the dropped row absent from the emitted sessions.

    Arrival order (maxFilesPerTrigger=1, mtime-ordered): a 12-event
    session at hours 0-2; an advancer at hour 50; another at hour 51;
    then a STALE row at hour 3 — Spark's late-row filter for batch N uses
    the watermark from batches <= N-2 (one batch of lag), so the stale
    row meets the hour-49 watermark and must be dropped."""
    import os
    from datetime import timedelta

    from retail_datalakehouse_spark.streaming.jobs import run_to_memory

    base = datetime(2024, 1, 1)
    batches = [
        [(i, base + timedelta(minutes=10 * i), 1) for i in range(12)],
        [(100, base + timedelta(hours=50), 2)],
        [(101, base + timedelta(hours=51), 4)],
        [(200, base + timedelta(hours=3), 3)],  # stale: wm is already 49h
    ]
    d = str(tmp_path / "src")
    os.makedirs(d)
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long")
        stage = str(tmp_path / f"stage{i}")
        df.coalesce(1).write.parquet(stage)
        import glob
        import shutil

        part = glob.glob(stage + "/part-*.parquet")[0]
        dest = os.path.join(d, f"chunk{i}.parquet")
        shutil.move(part, dest)
        os.utime(dest, (1_000_000_000 + i * 60,) * 2)

    schema = spark.read.parquet(os.path.join(d, "chunk0.parquet")).schema
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(d)
    sessions = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("s"), F.col("w.end").alias("e"), "user_id", "n_events")
    )
    sink, q = run_to_memory(sessions, output_mode="append", return_query=True)
    emitted = spark.table(sink).collect()

    # only user 1's closed session is emitted; the stale user-3 row is gone
    assert {r.user_id for r in emitted} == {1}
    assert emitted[0].n_events == 12

    from retail_datalakehouse_spark.streaming.jobs import state_metrics

    m = state_metrics(q)
    assert m["numRowsDroppedByWatermark"] >= 1  # stale row rejected at the operator
    assert m["numRowsRemoved"] >= 1  # the closed session left the state store
    assert m["numRowsTotal"] == 2  # only the two still-open advancer sessions remain


def test_parse_interval_us():
    """The session-gap parser must cover the fixed-length CalendarInterval
    subset (advice r6: the gap kwarg resolved through a one-entry dict, so
    any value but '30 minutes' was an opaque KeyError)."""
    import pytest

    from retail_datalakehouse_spark.streaming.jobs import parse_interval_us

    assert parse_interval_us("30 minutes") == 30 * 60 * 1_000_000
    assert parse_interval_us("1 minute") == 60 * 1_000_000
    assert parse_interval_us("90 seconds") == 90 * 1_000_000
    assert parse_interval_us("1 hour 30 minutes") == 5400 * 1_000_000
    assert parse_interval_us("250 milliseconds") == 250_000
    assert parse_interval_us("2 days") == 2 * 86_400 * 1_000_000
    for bad in ("", "soon", "3 months", "0 seconds"):
        with pytest.raises(ValueError):
            parse_interval_us(bad)


def test_custom_sessionizer_honors_nondefault_gap(spark, tmp_path):
    """session_close_stateful(gap='2 minutes') must actually cut on a
    2-minute gap: events at t0, t0+1m, t0+5m are two sessions under a
    2-minute gap and ONE under the old hardwired 30-minute behavior."""
    import os
    from datetime import timedelta

    from retail_datalakehouse_spark.streaming.jobs import session_close_stateful

    base = datetime(2024, 1, 1)
    rows = [(7, base), (7, base + timedelta(minutes=1)), (7, base + timedelta(minutes=5))]
    advancer = [(-1, base + timedelta(days=2))]
    d = str(tmp_path / "src")
    os.makedirs(d)
    for i, batch in enumerate((rows, advancer)):
        df = spark.createDataFrame(batch, "user_id long, ts timestamp")
        stage = str(tmp_path / f"stage{i}")
        df.coalesce(1).write.parquet(stage)
        import glob
        import shutil

        part = glob.glob(stage + "/part-*.parquet")[0]
        dest = os.path.join(d, f"chunk{i}.parquet")
        shutil.move(part, dest)
        os.utime(dest, (1_000_000_000 + i * 60,) * 2)

    schema = spark.read.parquet(os.path.join(d, "chunk0.parquet")).schema
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(d)
    sessions = session_close_stateful(
        stream.withWatermark("ts", "1 second"), gap="2 minutes"
    )
    sink = run_to_memory(sessions, output_mode="append", shuffle=2)
    got = sorted(
        (r.session_start, r.session_end, r.n_events)
        for r in spark.table(sink).filter("user_id = 7").collect()
    )
    assert got == [
        (base, base + timedelta(minutes=3), 2),
        (base + timedelta(minutes=5), base + timedelta(minutes=7), 1),
    ]


def test_ewma_stateful_split_invariant(spark, tmp_path):
    """The stateful EWMA fold must be arrival-slicing-invariant: folding a
    series in 1 micro-batch vs 4 yields bit-identical results, and both
    equal the plain recurrence computed locally (state carries exactly
    (last_ewma, last_day))."""
    import os
    from datetime import date, timedelta

    from retail_datalakehouse_spark.streaming.jobs import ewma_stateful, run_to_memory

    base = date(2024, 1, 1)
    series = [("A", base + timedelta(days=i), float(10 + (i * 7) % 13)) for i in range(40)]
    series += [("B", base + timedelta(days=i), float(5 + (i * 3) % 11)) for i in range(40)]

    def run_chunked(n_chunks: int, sub: str):
        d = str(tmp_path / f"src_{sub}")
        os.makedirs(d)
        per = 40 // n_chunks
        for i in range(n_chunks):
            days = {base + timedelta(days=j) for j in range(i * per, (i + 1) * per)}
            rows = [r for r in series if r[1] in days]
            df = spark.createDataFrame(rows, "pri string, day date, rev double")
            stage = str(tmp_path / f"stage_{sub}_{i}")
            df.coalesce(1).write.parquet(stage)
            import glob
            import shutil

            part = glob.glob(stage + "/part-*.parquet")[0]
            dest = os.path.join(d, f"chunk{i}.parquet")
            shutil.move(part, dest)
            os.utime(dest, (1_000_000_000 + i * 60,) * 2)
        schema = spark.read.parquet(os.path.join(d, "chunk0.parquet")).schema
        stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(d)
        sink = run_to_memory(ewma_stateful(stream, alpha=0.3), output_mode="append")
        return {(r.pri, r.day): r.ewma for r in spark.table(sink).collect()}

    one = run_chunked(1, "one")
    four = run_chunked(4, "four")
    assert one == four  # bit-identical, not approximately

    # and both equal the local recurrence
    expected = {}
    for key in ("A", "B"):
        last = None
        for pri, day, rev in sorted([r for r in series if r[0] == key], key=lambda r: r[1]):
            last = rev if last is None else 0.3 * rev + 0.7 * last
            expected[(pri, day)] = last
    assert one == expected


def test_streaming_corpus_ingest_multibatch_equals_batch(spark, sf_dir):
    """t10: three crawl-drop micro-batches through the quality gate +
    fingerprint MERGE must equal the one-shot batch computation, and the
    stream must actually run multiple micro-batches (maxFilesPerTrigger=1
    over 3 staged drops)."""
    from pyspark.sql import functions as F

    from retail_datalakehouse_spark.operators.text import (
        fingerprint,
        language_id,
        quality_score,
        tokens,
    )
    from retail_datalakehouse_spark.queries.base import REGISTRY

    streamed = {
        (r.lang_pred, r.lang): (r.n_docs, r.total_tokens, r.avg_quality)
        for r in REGISTRY["t10_streaming_corpus_ingest"].fn(spark, sf_dir).collect()
    }
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id",
        "lang",
        language_id("text").alias("lang_pred"),
        quality_score("text").alias("q"),
        fingerprint("text").alias("fp"),
        F.size(tokens("text")).cast("long").alias("n_tokens"),
    )
    from pyspark.sql import Window

    gated = d.filter((F.col("q") >= 0.6) & (F.col("lang_pred") != "unknown"))
    surv = (
        gated.withColumn(
            "rn", F.row_number().over(Window.partitionBy("fp").orderBy("doc_id"))
        )
        .filter(F.col("rn") == 1)
    )
    batch = {
        (r.lang_pred, r.lang): (r.n_docs, r.total_tokens, r.avg_quality)
        for r in surv.groupBy("lang_pred", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(
                F.sum(F.col("q").cast("decimal(25,8)")).cast("double") / F.count("q"), 6
            ).alias("avg_quality"),
        )
        .collect()
    }
    assert streamed == batch and len(streamed) > 0


def test_documents_stream_drops_stages_n_files(spark, sf_dir, tmp_path):
    import glob

    from retail_datalakehouse_spark.streaming.jobs import documents_stream_drops

    d = str(tmp_path / "drops")
    stream = documents_stream_drops(spark, sf_dir, n_drops=3, stage_dir=d)
    assert stream.isStreaming
    files = glob.glob(d + "/drop_*.parquet")
    assert len(files) == 3
    # the split is a partition: drops are disjoint and cover the corpus
    total = sum(spark.read.parquet(f).count() for f in files)
    assert total == spark.read.parquet(f"{sf_dir}/documents.parquet").count()


def test_streaming_neardup_index_matches_only_prior_drops(spark, sf_dir):
    """t11: every recorded match partner must come from a STRICTLY earlier
    crawl drop (the index only ever holds prior batches' bands), and docs
    with near-dups inside their own drop only are unmatched."""
    from retail_datalakehouse_spark.queries.base import REGISTRY

    def drop_of(doc_id):
        return 0 if doc_id < 333 else (1 if doc_id < 666 else 2)

    rows = REGISTRY["t11_streaming_neardup_index"].fn(spark, sf_dir).collect()
    assert rows and any(r.n_prior > 0 for r in rows)
    for r in rows:
        if r.best_match is not None:
            assert drop_of(r.best_match) < drop_of(r.new_id), (r.new_id, r.best_match)


def test_rocksdb_state_store_runs_engine_streams(spark, tmp_path):
    """The production state backend for 100 TB streams: state larger than
    executor memory lives in RocksDB with incremental changelog
    checkpoints. Pin that the engine's stateful operators run unchanged
    on the RocksDB provider and produce the same results as the default
    HDFS-backed store — the state-store choice is config, not code."""
    rows = [(i, datetime(2024, 6, 1, 0, i % 60), i % 5, "click", float(i)) for i in range(200)]
    _write_batch(spark, tmp_path / "ev", rows)
    schema = spark.read.parquet(str(tmp_path / "ev")).schema

    def run() -> set:
        stream = read_file_stream(spark, str(tmp_path / "ev"), schema)
        sink = run_to_memory(tumbling_agg(stream, "15 minutes"), output_mode="complete")
        return {tuple(r) for r in spark.table(sink).collect()}

    key = "spark.sql.streaming.stateStore.providerClass"
    default = run()
    old = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = read_file_stream(spark, str(tmp_path / "ev"), schema)
        sink, q = run_to_memory(
            tumbling_agg(stream, "15 minutes"), output_mode="complete", return_query=True
        )
        rocks = {tuple(r) for r in spark.table(sink).collect()}
        # really ran on RocksDB: the provider's custom metrics are present
        metrics = q.recentProgress[-1]["stateOperators"][0].get("customMetrics", {})
        assert any("rocksdb" in k.lower() for k in metrics), sorted(metrics)[:5]
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)
    assert rocks == default and rocks


def test_cdf_stream_scale_source_matches_simple(spark, tmp_path):
    """Path equivalence of the two CDF stream sources: the
    partition-planning reader (executor-parallel file reads) must deliver
    exactly the row set the simple driver-iterating reader does, across
    appends, a merge, and a delete — and resume exactly-once across a
    restart with commits in between."""
    from retail_datalakehouse_spark.sources.pydatasource import (
        VersionedCdfScaleStreamDataSource,
        VersionedCdfStreamDataSource,
    )
    from retail_datalakehouse_spark.sources.table_format import VersionedTable

    for src in (VersionedCdfStreamDataSource, VersionedCdfScaleStreamDataSource):
        try:
            spark.dataSource.register(src)
        except Exception:
            pass

    t = VersionedTable(spark, str(tmp_path / "tbl"), record_cdf=True, cdf_keys=["k"])
    df = spark.range(100).select(F.col("id").alias("k"), (F.col("id") * 2.0).alias("p"))
    t.append(df.filter("k < 60"))  # v1
    t.append(df.filter("k >= 60"))  # v2

    outs = {}
    for fmt in ("versioned_cdf_stream", "versioned_cdf_stream_scale"):
        out = str(tmp_path / f"out_{fmt}")
        ckpt = str(tmp_path / f"ckpt_{fmt}")

        def run(fmt=fmt, out=out, ckpt=ckpt):
            q = (
                spark.readStream.format(fmt)
                .option("path", t.path)
                .option("tableSchema", "k bigint, p double")
                .load()
                .writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        run()
        outs[fmt] = out

    # commits while both streams are down
    t.merge(df.filter("k >= 20 and k < 40").withColumn("p", F.col("p") + 1.0), ["k"])
    t.delete(F.col("k") % 10 == 0)

    rows = {}
    for fmt, out in outs.items():
        # restart: deliver v3-v4 exactly once
        q = (
            spark.readStream.format(fmt)
            .option("path", t.path)
            .option("tableSchema", "k bigint, p double")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / f"ckpt_{fmt}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows[fmt] = sorted(
            map(tuple, spark.read.parquet(out).collect())
        )

    assert rows["versioned_cdf_stream"] == rows["versioned_cdf_stream_scale"]
    versions = {r[-1] for r in rows["versioned_cdf_stream_scale"]}
    assert versions == {1, 2, 3, 4}

    # exactly-once, zero-redelivery half (moved here from the
    # t28_cdf_stream_mor gate, VERDICT r13 item 4): with no new commits,
    # a THIRD run must deliver nothing at all
    fmt, out = "versioned_cdf_stream_scale", outs["versioned_cdf_stream_scale"]
    before = spark.read.parquet(out).count()
    q = (
        spark.readStream.format(fmt)
        .option("path", t.path)
        .option("tableSchema", "k bigint, p double")
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / f"ckpt_{fmt}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert spark.read.parquet(out).count() == before


def test_cdf_stream_schema_inference(spark, tmp_path):
    """With no tableSchema option, the CDF sources derive the schema from
    the latest change-feed parquet footer and deliver identical rows."""
    from retail_datalakehouse_spark.sources.pydatasource import (
        VersionedCdfScaleStreamDataSource,
    )
    from retail_datalakehouse_spark.sources.table_format import VersionedTable

    try:
        spark.dataSource.register(VersionedCdfScaleStreamDataSource)
    except Exception:
        pass
    t = VersionedTable(spark, str(tmp_path / "tbl"), record_cdf=True, cdf_keys=["k"])
    t.append(
        spark.range(10).select(F.col("id").alias("k"), (F.col("id") * 1.5).alias("p"))
    )
    out = str(tmp_path / "out")
    q = (
        spark.readStream.format("versioned_cdf_stream_scale")
        .option("path", t.path)  # NO tableSchema: inferred from CDF footer
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert set(got.columns) == {"k", "p", "_change_type", "_version"}
    assert got.count() == 10
    assert {r._change_type for r in got.collect()} == {"insert"}


def test_cdf_stream_metadata_commits(spark, tmp_path):
    """Metadata-only commits in a CDF stream's version range: zero-row,
    schema-intact ops (add_check/drop_check/clone) flow through as EMPTY
    deltas; schema-CHANGING ops (rename/drop column) fail the stream
    explicitly instead of silently null-filling the fixed stream schema
    (the Delta column-mapping streaming contract)."""
    import pytest

    from retail_datalakehouse_spark.sources.pydatasource import (
        VersionedCdfScaleStreamDataSource,
        VersionedCdfStreamDataSource,
    )
    from retail_datalakehouse_spark.sources.table_format import VersionedTable

    for src in (VersionedCdfStreamDataSource, VersionedCdfScaleStreamDataSource):
        try:
            spark.dataSource.register(src)
        except Exception:
            pass

    for fmt in ("versioned_cdf_stream", "versioned_cdf_stream_scale"):
        base = str(tmp_path / fmt)
        t = VersionedTable(spark, base + "_tbl", record_cdf=True, cdf_keys=["k"])
        t.append(spark.createDataFrame([(1, 10.0)], ["k", "p"]))
        t.add_check("p_positive", "p > 0")  # metadata-only, schema intact
        t.append(spark.createDataFrame([(2, 20.0)], ["k", "p"]))

        out, ckpt = base + "_out", base + "_ckpt"
        q = (
            spark.readStream.format(fmt)
            .option("path", t.path)
            .option("tableSchema", "k bigint, p double")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = spark.read.parquet(out)
        assert {r.k for r in got.collect()} == {1, 2}, fmt  # check commit skipped

        # a rename mid-range fails the stream EXPLICITLY (fresh table so
        # the failure version is inside the unread range)
        t2 = VersionedTable(spark, base + "_tbl2", record_cdf=True, cdf_keys=["k"])
        t2.append(spark.createDataFrame([(1, 10.0)], ["k", "p"]))
        t2.rename_column("p", "price")
        q2 = (
            spark.readStream.format(fmt)
            .option("path", t2.path)
            .option("tableSchema", "k bigint, p double")
            .load()
            .writeStream.format("parquet")
            .option("path", base + "_out2")
            .option("checkpointLocation", base + "_ckpt2")
            .trigger(availableNow=True)
            .start()
        )
        with pytest.raises(Exception, match="column mapping|restart the stream"):
            q2.awaitTermination(180)


def _ttl_drops(spark, tmp_path):
    import datetime as dt
    import os

    from retail_datalakehouse_spark.streaming.jobs import write_single_parquet

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    drops = [
        [(1, base), (2, base + dt.timedelta(seconds=5))],
        [(1, base + dt.timedelta(minutes=3)), (3, base + dt.timedelta(minutes=4))],
        [(1, base + dt.timedelta(minutes=20)), (4, base + dt.timedelta(minutes=21))],
        # advancer: flushes everyone idle > gap; its own timer stays past
        # the final watermark, so user 99 must NOT emit
        [(99, base + dt.timedelta(hours=3))],
    ]
    d = str(tmp_path / "ttl_drops")
    os.makedirs(d, exist_ok=True)
    for i, rows in enumerate(drops):
        p = os.path.join(d, f"c{i}.parquet")
        write_single_parquet(
            spark.createDataFrame(rows, "user_id long, ts timestamp"), p
        )
        os.utime(p, (1_000_000_000 + i * 60,) * 2)
    return d


def _run_ttl(spark, d, api):
    from retail_datalakehouse_spark.streaming.jobs import (
        idle_user_flush,
        run_to_memory,
    )

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    out = idle_user_flush(stream, gap_ms=600_000, force_api=api)
    sink = run_to_memory(out, output_mode="append", shuffle=4)
    return sorted(
        (r.user_id, r.n_events, r.last_ms) for r in spark.table(sink).collect()
    )


def test_timer_ttl_drill_lanes_agree(spark, tmp_path):
    """Timer-driven state expiry (the TTL drill): the Spark 4 typed-state
    lane (transformWithStateInPandas, EVENT-TIME timers fired by the
    watermark) and the applyInPandasWithState EventTimeTimeout fold must
    produce IDENTICAL flushes on the same micro-batch sequence. Gated:
    skips when no protobuf is reachable by the session's JVM-spawned
    runners (ensure_protobuf is the authoritative end-to-end check)."""
    import pytest

    from retail_datalakehouse_spark.streaming.jobs import ensure_protobuf

    d = _ttl_drops(spark, tmp_path)
    expected = [
        (1, 3, 1704111600000),  # all three events; flushed by final wm
        (2, 1, 1704110405000),  # idle > gap mid-stream: flushed by TIMER
        (3, 1, 1704110640000),
        (4, 1, 1704111660000),
        # user 99 (the advancer) absent: its timer is past the final wm
    ]
    assert _run_ttl(spark, d, "apiws") == expected
    if not ensure_protobuf(spark):
        pytest.skip("no protobuf reachable by JVM-spawned runners")
    prov = spark.conf.get("spark.sql.streaming.stateStore.providerClass", "")
    try:
        assert _run_ttl(spark, d, "tws") == expected
    finally:
        if prov:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prov)


def test_stateful_processor_both_lanes_equal(spark, tmp_path):
    """t23's operator on BOTH arbitrary-state APIs: the typed
    StatefulProcessor lane (protobuf state-server protocol) and the
    applyInPandasWithState fold emit identical cumulative totals."""
    import os

    import pytest

    from retail_datalakehouse_spark.streaming.jobs import (
        ensure_protobuf,
        run_to_memory,
        running_user_totals,
        write_single_parquet,
    )

    if not ensure_protobuf(spark):
        pytest.skip("no protobuf reachable by JVM-spawned runners")

    d = str(tmp_path / "drops")
    os.makedirs(d, exist_ok=True)
    rows = [(i % 7, float(i) + 0.25) for i in range(40)]
    for b in range(2):
        p = os.path.join(d, f"c{b}.parquet")
        write_single_parquet(
            spark.createDataFrame(
                rows[b * 20 : (b + 1) * 20], "user_id long, value double"
            ),
            p,
        )
        os.utime(p, (1_000_000_000 + b * 60,) * 2)

    def final(api):
        stream = (
            spark.readStream.schema("user_id long, value double")
            .option("maxFilesPerTrigger", 1)
            .parquet(d)
        )
        sink = run_to_memory(
            running_user_totals(stream, force_api=api),
            output_mode="update",
            shuffle=4,
        )
        em = spark.table(sink)
        return sorted(
            (r.user_id, r.n_events, r.total_cents)
            for r in em.groupBy("user_id")
            .agg(
                F.max("n_events").alias("n_events"),
                F.max("total_cents").alias("total_cents"),
            )
            .collect()
        )

    prov = spark.conf.get("spark.sql.streaming.stateStore.providerClass", "")
    try:
        tws = final("tws")
    finally:
        if prov:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prov)
    assert tws == final("apiws")
    assert len(tws) == 7 and all(n == 6 or n == 5 for _, n, _ in tws)
