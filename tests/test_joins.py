"""Unit tests: as-of join (J9) and MERGE (S7) on crafted fixtures."""

from __future__ import annotations

from datetime import datetime

from retail_datalakehouse_spark.operators.joins import asof_join
from retail_datalakehouse_spark.operators.merge import merge_upsert


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_join_picks_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00"), "L1"), (1, _ts("2024-01-01T12:00:00"), "L2"),
         (2, _ts("2024-01-01T09:00:00"), "L3")],
        ["k", "ts", "lbl"],
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T09:30:00"), 100), (1, _ts("2024-01-01T11:00:00"), 200),
         (2, _ts("2024-01-01T09:30:00"), 300)],
        ["k", "ts", "v"],
    )
    out = {r.lbl: r.v_asof for r in asof_join(left, right, ["k"], "ts", "ts").collect()}
    assert out == {"L1": 100, "L2": 200, "L3": None}  # L3: no right row <= 09:00


def test_asof_join_equal_ts_tie(spark):
    left = spark.createDataFrame([(1, _ts("2024-01-01T10:00:00"), "L")], ["k", "ts", "lbl"])
    right = spark.createDataFrame([(1, _ts("2024-01-01T10:00:00"), 7)], ["k", "ts", "v"])
    nonstrict = asof_join(left, right, ["k"], "ts", "ts").collect()[0]
    strict = asof_join(left, right, ["k"], "ts", "ts", strict=True).collect()[0]
    assert nonstrict.v_asof == 7  # ts == left_ts matches when not strict
    assert strict.v_asof is None  # strict < excludes the equal-ts row


def test_merge_upsert_update_and_insert(spark):
    target = spark.createDataFrame([(1, "a", 10.0), (2, "b", 20.0)], ["id", "s", "v"])
    updates = spark.createDataFrame([(2, "b2", 99.0), (3, "c", 30.0)], ["id", "s", "v"])
    out = {r.id: (r.s, r.v) for r in merge_upsert(target, updates, ["id"]).collect()}
    assert out == {1: ("a", 10.0), 2: ("b2", 99.0), 3: ("c", 30.0)}


def test_merge_upsert_idempotent(spark):
    """SURVEY §5.5: applying the same correction twice ≡ once."""
    target = spark.createDataFrame([(i, float(i)) for i in range(20)], ["id", "v"])
    updates = spark.createDataFrame([(i, float(i) * 100) for i in range(0, 20, 3)], ["id", "v"])
    once = merge_upsert(target, updates, ["id"])
    twice = merge_upsert(once, updates, ["id"])
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))
