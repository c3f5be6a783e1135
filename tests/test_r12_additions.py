"""Round-12 additions.

Pins the iterator-UDF init-scope contract that u10_pandas_iter_udf's
docstring claims (init runs once per TASK, not once per Arrow batch) —
the gap ADVICE r11 flagged: the query asserted only the partition count,
never the init count.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import functions as F


def test_iter_udf_init_once_per_task(spark):
    """Iterator[pd.Series] UDF: the function body (init scope) enters
    once per task; the hot loop enters once per Arrow batch. With
    maxRecordsPerBatch forced tiny, batches >> tasks — so the two
    accumulators can only agree with the contract, not by accident."""
    sc = spark.sparkContext
    init_acc = sc.accumulator(0)
    batch_acc = sc.accumulator(0)

    n_parts = 4
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "10")
    try:
        df = (
            spark.range(0, 400)
            .repartition(n_parts, "id")
            .select(F.col("id").cast("double").alias("v"))
        )

        @F.pandas_udf("double")
        def marked(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
            init_acc.add(1)  # once per function-body entry = per task
            for b in batches:
                batch_acc.add(1)  # once per Arrow batch
                yield b * 2.0

        total = df.select(F.sum(marked("v"))).first()[0]
        assert total == sum(range(400)) * 2.0
        assert init_acc.value == n_parts
        # 400 rows / 10-row batches across 4 tasks -> ~40 batches; the
        # point is batches strictly exceed inits (init is NOT per-batch)
        assert batch_acc.value >= 2 * n_parts
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)


def test_restore_enforces_unique_constraint(spark):
    """ADVICE r11: restore is NOT row-preserving relative to constraint
    history — restoring to a version that predates the dedup must abort
    instead of republishing duplicate keys under the carried-forward
    uniques metadata."""
    import tempfile

    from retail_datalakehouse_spark.sources.constraints import UniqueViolation
    from retail_datalakehouse_spark.sources.table_format import VersionedTable

    t = VersionedTable(spark, tempfile.mkdtemp(prefix="rdl_rst_uq_"))
    t.overwrite(spark.createDataFrame([(1, "a"), (1, "b")], "k long, v string"))
    v_dup = t.current_version()
    t.overwrite(spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"))
    t.add_unique("pk", ["k"])
    try:
        t.restore(v_dup)
        raise AssertionError("restore republished duplicate keys")
    except UniqueViolation:
        pass
    # table is unchanged and still readable after the aborted restore
    assert t.read().count() == 2
    # restoring to a version that SATISFIES the constraint works
    v_ok = t.current_version()
    t.append(spark.createDataFrame([(3, "c")], "k long, v string"))
    t.restore(v_ok)
    assert t.read().count() == 2


def test_restore_enforces_check_constraint(spark):
    """Same contract for CHECKs: a snapshot predating add_check must
    pass validation before a restore republishes it."""
    import tempfile

    from retail_datalakehouse_spark.sources.constraints import ConstraintViolation
    from retail_datalakehouse_spark.sources.table_format import VersionedTable

    t = VersionedTable(spark, tempfile.mkdtemp(prefix="rdl_rst_ck_"))
    t.overwrite(spark.createDataFrame([(1, -5.0), (2, 3.0)], "k long, p double"))
    v_bad = t.current_version()
    t.overwrite(spark.createDataFrame([(1, 1.0), (2, 3.0)], "k long, p double"))
    t.add_check("positive_p", "p > 0")
    try:
        t.restore(v_bad)
        raise AssertionError("restore republished check-violating rows")
    except ConstraintViolation:
        pass
    assert t.read().filter("p <= 0").count() == 0


def test_iceberg_export_guards_and_schema(spark):
    """Scope guards mirror the Delta exporter; the schema converter
    round-trips every primitive the testdata uses (ids are stable)."""
    import tempfile

    from pyspark.sql import functions as F

    from retail_datalakehouse_spark.sources.iceberg_import import _spark_schema
    from retail_datalakehouse_spark.sources.table_format import (
        VersionedTable,
        _iceberg_schema,
    )

    df = spark.range(3).select(
        F.col("id").alias("k"),
        F.lit("x").alias("s"),
        F.lit(1.5).alias("d"),
        F.current_date().alias("dt"),
        F.current_timestamp().alias("ts"),
        F.lit(2).cast("decimal(12,2)").alias("m"),
    )
    ice, ids = _iceberg_schema(df.schema)
    assert [f["id"] for f in ice["fields"]] == [1, 2, 3, 4, 5, 6]
    assert ids == {"k": 1, "s": 2, "d": 3, "dt": 4, "ts": 5, "m": 6}
    back = _spark_schema(ice)
    assert [f.dataType for f in back.fields] == [f.dataType for f in df.schema.fields]

    # partitioned layouts refuse (partitionValues not emitted)
    t = VersionedTable(spark, tempfile.mkdtemp(prefix="rdl_ice_guard_"))
    t.overwrite(
        spark.createDataFrame([(1, "a"), (2, "b")], "k long, part string"),
        partition_by=["part"],
    )
    try:
        t.export_iceberg_metadata()
        raise AssertionError("partitioned export should refuse")
    except ValueError:
        pass

    # forward-only lineage: exporting an OLDER version than the last raises
    t2 = VersionedTable(spark, tempfile.mkdtemp(prefix="rdl_ice_fwd_"))
    t2.overwrite(spark.createDataFrame([(1, "a")], "k long, v string"))
    v1 = t2.current_version()
    t2.append(spark.createDataFrame([(2, "b")], "k long, v string"))
    t2.export_iceberg_metadata()
    try:
        t2.export_iceberg_metadata(version=v1)
        raise AssertionError("backward export should refuse")
    except ValueError:
        pass


def test_rocksdb_state_restart_equivalence(spark, tmp_path):
    """Stateful running totals under the RocksDB provider: a restarted
    query over the same checkpoint restores state (cumulative totals
    continue), and a restart with NO new data commits nothing."""
    import glob
    import os

    from pyspark.sql import functions as F

    from retail_datalakehouse_spark.streaming.jobs import (
        _require_rocksdb_state_store,
        restore_state_store_provider,
        run_foreach_batch,
        running_user_totals,
    )

    src, ckpt, out = str(tmp_path / "src"), str(tmp_path / "ckpt"), str(tmp_path / "out")
    os.makedirs(src)
    rows1 = [(i, i % 3, 1.0) for i in range(9)]
    rows2 = [(i + 9, i % 3, 2.0) for i in range(9)]
    sch = "event_id long, user_id long, value double"
    spark.createDataFrame(rows1, sch).coalesce(1).write.parquet(src + "/a")
    schema = spark.read.parquet(src + "/a").schema

    def sink(b, bid):
        b.withColumn("batch_id", F.lit(bid)).write.mode("append").parquet(out)

    def run():
        s = spark.readStream.schema(schema).option("pathGlobFilter", "*.parquet").parquet(src + "/*")
        run_foreach_batch(running_user_totals(s, force_api="apiws"), sink, checkpoint=ckpt)

    prior = _require_rocksdb_state_store(spark)
    try:
        run()
        run()  # no new data: offsets committed, nothing re-emits
        n_after_noop = spark.read.parquet(out).count()
        assert n_after_noop == 3  # 3 users, one cumulative row each
        spark.createDataFrame(rows2, sch).coalesce(1).write.parquet(src + "/b")
        run()
    finally:
        restore_state_store_provider(spark, prior)

    em = spark.read.parquet(out)
    # RocksDB artifacts really backed the state
    exts = {
        os.path.splitext(f)[1]
        for f in glob.glob(os.path.join(ckpt, "state", "**", "*"), recursive=True)
        if os.path.isfile(f)
    }
    assert ".sst" in exts or ".zip" in exts, exts
    # state restored: each user's final count = 6 (3 + 3), cents = 3*100 + 3*200
    final = em.groupBy("user_id").agg(
        F.max("n_events").alias("n"), F.max("total_cents").alias("c")
    )
    assert {(r.n, r.c) for r in final.collect()} == {(6, 900)}
