"""Bucketed co-located joins: layout changes, results don't."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from retail_datalakehouse_spark.sources.bucketing import bucketed_join, write_bucketed


@pytest.fixture(scope="module")
def bucketed_pair(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("buckets")
    left = spark.createDataFrame(
        [(i % 50, f"l{i}") for i in range(1000)], ["k", "lv"]
    )
    right = spark.createDataFrame(
        [(i % 50, f"r{i}") for i in range(500)], ["k", "rv"]
    )
    write_bucketed(left, "tb_left", ["k"], n_buckets=4, path=str(base / "l"))
    write_bucketed(right, "tb_right", ["k"], n_buckets=4, path=str(base / "r"))
    yield left, right
    spark.sql("DROP TABLE IF EXISTS tb_left")
    spark.sql("DROP TABLE IF EXISTS tb_right")


def test_bucketed_join_matches_plain_join(spark, bucketed_pair):
    left, right = bucketed_pair
    got = bucketed_join(spark, "tb_left", "tb_right", on=["k"])
    want = left.join(right, "k")
    assert got.count() == want.count()
    ga = got.groupBy("k").count().orderBy("k").collect()
    wa = want.groupBy("k").count().orderBy("k").collect()
    assert ga == wa


def test_bucketed_join_plan_has_no_exchange_or_sort(spark, bucketed_pair):
    j = bucketed_join(spark, "tb_left", "tb_right", on=["k"])
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, "co-bucketed scan must not shuffle"
    assert "Sort " not in plan, "one-file-per-bucket sorted scan must not re-sort"


def test_bucketed_write_is_idempotent(spark, bucketed_pair, tmp_path):
    left, _ = bucketed_pair
    # re-register the same table name at a new path — must not fail
    write_bucketed(left, "tb_left", ["k"], n_buckets=4, path=str(tmp_path / "l2"))
    assert spark.table("tb_left").count() == 1000
