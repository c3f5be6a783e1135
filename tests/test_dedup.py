"""Unit tests for deduplication operators (SURVEY §2.6 O4, §2.10 L1)."""

from __future__ import annotations

from retail_datalakehouse_spark.operators.dedup import dedup_exact_content, dedup_keep_first


def test_dedup_keep_first_deterministic_survivor(spark):
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 5), (3, "b", 7), (4, "b", 7), (5, "c", 1)],
        ["id", "key", "v"],
    )
    out = dedup_keep_first(df, keys=["key"], order_by=["id"])
    got = {(r.key, r.id) for r in out.collect()}
    assert got == {("a", 1), ("b", 3), ("c", 5)}


def test_dedup_keep_first_idempotent(spark):
    df = spark.createDataFrame([(i, i % 3) for i in range(30)], ["id", "key"])
    once = dedup_keep_first(df, keys=["key"], order_by=["id"])
    twice = dedup_keep_first(once, keys=["key"], order_by=["id"])
    assert sorted(once.collect()) == sorted(twice.collect())


def test_dedup_exact_content_min_id_survives(spark):
    df = spark.createDataFrame(
        [(10, "hello"), (3, "hello"), (7, "world"), (1, "x")], ["doc_id", "text"]
    )
    out = dedup_exact_content(df, content_col="text", id_col="doc_id")
    got = {(r.text, r.doc_id) for r in out.collect()}
    assert got == {("hello", 3), ("world", 7), ("x", 1)}


def test_fan_out_repairs_narrow_plans_and_preserves_rows(spark):
    """fan_out widens a single-split plan to >= defaultParallelism
    partitions without adding/dropping/duplicating rows, and is a strict
    no-op (same plan object) when the input is already wide enough."""
    from pyspark.sql import functions as F

    from retail_datalakehouse_spark.operators.parallelism import fan_out

    narrow = spark.range(1000).coalesce(1).select(F.col("id"))
    widened = fan_out(narrow)
    assert widened.rdd.getNumPartitions() >= spark.sparkContext.defaultParallelism
    assert sorted(r.id for r in widened.collect()) == list(range(1000))
    wide = spark.range(1000).repartition(64)
    assert fan_out(wide) is wide  # already parallel enough: no shuffle inserted
