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
