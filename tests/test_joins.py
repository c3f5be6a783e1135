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


def test_merge_sync_not_matched_by_source(spark):
    """r11: merge_sync's three legs — matched update, source-only insert,
    conditional retirement of unmatched target rows — plus the NULL-
    source-value trap (a NULL update must still count as matched)."""
    from retail_datalakehouse_spark.operators.merge import merge_sync

    target = spark.createDataFrame(
        [(1, "F", 10.0), (2, "O", 20.0), (3, "F", 30.0), (4, "O", 40.0)],
        ["id", "status", "v"],
    )
    source = spark.createDataFrame(
        [(1, 111.0), (2, None), (9, 99.0)], "id long, v double"
    )
    out = merge_sync(
        target,
        source,
        keys=["id"],
        update_cols=["v"],
        delete_unmatched_when="status = 'F'",
    )
    rows = {r.id: (r.status, r.v) for r in out.collect()}
    assert rows[1] == ("F", 111.0)        # matched: updated, survives delete cond
    assert rows[2] == ("O", None)         # matched with NULL value: still matched
    assert 3 not in rows                  # unmatched + status F: retired
    assert rows[4] == ("O", 40.0)         # unmatched + not F: kept
    assert rows[9][1] == 99.0             # source-only: inserted (status null)
    assert rows[9][0] is None

    # no delete predicate: unmatched rows all kept
    keep_all = merge_sync(target, source, keys=["id"], update_cols=["v"])
    assert keep_all.count() == 5


def test_asof_nearest_directions_and_tolerance(spark):
    """r11: asof_nearest — backward-beats-forward tie, equal-ts zero
    distance, forward-only match, tolerance nulling, per-key isolation."""
    from retail_datalakehouse_spark.operators.joins import asof_nearest

    left = spark.createDataFrame(
        [("a", 1, 100), ("a", 2, 205), ("a", 3, 500), ("b", 4, 100)],
        ["k", "lid", "ts"],
    )
    right = spark.createDataFrame(
        [("a", 10, 90), ("a", 11, 210), ("a", 12, 205), ("b", 13, 5000)],
        ["k", "rid", "ts"],
    )
    out = asof_nearest(
        left, right, on=["k"], left_ts="ts", right_ts="ts",
        right_id="rid", tolerance=300,
    )
    got = {r.lid: (r.rid_asof, r.asof_dist) for r in out.collect()}
    assert got[1] == (10, 10)    # backward 90 (d10) beats forward 205 (d105)
    assert got[2] == (12, 0)     # equal ts: distance 0, backward side
    assert got[3] == (11, 290)   # nearest within tolerance
    assert got[4] == (None, None)  # b: only match at distance 4900 > tol
    assert out.count() == 4

    # backward-vs-forward EXACT tie prefers backward
    l2 = spark.createDataFrame([("a", 1, 100)], ["k", "lid", "ts"])
    r2 = spark.createDataFrame([("a", 20, 90), ("a", 21, 110)], ["k", "rid", "ts"])
    tie = asof_nearest(l2, r2, on=["k"], left_ts="ts", right_ts="ts", right_id="rid")
    assert tie.first().rid_asof == 20
