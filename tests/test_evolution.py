"""Schema evolution (UPDATE/DEPRECATE semantics), CDC merge with deletes,
and compaction tests."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from retail_datalakehouse_spark.operators.merge import merge_cdc
from retail_datalakehouse_spark.sources.evolution import (
    append_batch,
    read_evolved,
    schema_report,
)
from retail_datalakehouse_spark.sources.table_format import VersionedTable, compact


def test_schema_evolution_update_and_deprecate(spark, tmp_path):
    """New column appears (UPDATE_IN_DATABASE), removed column survives as
    nullable (DEPRECATE_IN_DATABASE) — glue_infra.py:101-104 semantics."""
    path = str(tmp_path / "tbl")
    append_batch(spark.createDataFrame([(1, "a")], ["id", "old_col"]), path)
    append_batch(spark.createDataFrame([(2, "b", 9.5)], ["id", "old_col", "new_col"]), path)
    append_batch(spark.createDataFrame([(3, 1.5)], ["id", "new_col"]), path)  # old_col dropped

    unified = read_evolved(spark, path)
    assert set(unified.columns) == {"id", "old_col", "new_col"}
    rows = {r.id: (r.old_col, r.new_col) for r in unified.collect()}
    assert rows[1] == ("a", None)  # predates new_col
    assert rows[2] == ("b", 9.5)
    assert rows[3] == (None, 1.5)  # old_col deprecated, not dropped

    report = {r.column_name: r.status for r in schema_report(spark, path).collect()}
    assert report["new_col"] == "active"
    assert report["old_col"] == "deprecated"


def test_merge_cdc_upserts_and_deletes(spark):
    target = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], ["id", "s"])
    changes = spark.createDataFrame(
        [(2, "B2", "upsert", 10), (3, None, "delete", 11), (4, "d", "upsert", 12)],
        ["id", "s", "op", "seq"],
    )
    out = {r.id: r.s for r in merge_cdc(target, changes, ["id"], order_by=["seq"]).collect()}
    assert out == {1: "a", 2: "B2", 4: "d"}  # 3 deleted, 2 updated, 4 inserted


def test_merge_cdc_last_change_wins(spark):
    """A key upserted then deleted in one batch ends deleted; the reverse
    ends upserted — fold order is the explicit `seq`, not arrival order."""
    target = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "s"])
    changes = spark.createDataFrame(
        [
            (1, "x", "upsert", 1), (1, None, "delete", 2),   # delete last → gone
            (2, None, "delete", 1), (2, "y", "upsert", 2),   # upsert last → y
        ],
        ["id", "s", "op", "seq"],
    )
    out = {r.id: r.s for r in merge_cdc(target, changes, ["id"], order_by=["seq"]).collect()}
    assert out == {2: "y"}


def test_compaction_preserves_contents_and_history(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "tbl"))
    # simulate micro-batch ingest: a deliberately fragmented snapshot
    df = spark.createDataFrame([(i, i * 1.0) for i in range(1000)], ["id", "v"]).repartition(64)
    t.overwrite(df)

    def n_files(version: int) -> int:
        d = tmp_path / "tbl" / t._manifest(version)["data_dir"]
        return len([f for f in os.listdir(str(d)) if f.endswith(".parquet")])

    v1_files = n_files(1)
    v2 = compact(t, target_partitions=4)
    v2_files = n_files(v2)
    assert v2_files < v1_files and v2_files <= 4
    # contents identical; pre-compaction snapshot still readable
    assert t.read().agg(F.sum("v")).collect()[0][0] == t.read_version(1).agg(F.sum("v")).collect()[0][0]
    assert t.read().count() == 1000
    assert t.history()[-1]["operation"] == "compact"
