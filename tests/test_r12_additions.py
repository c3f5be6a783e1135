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

    # hidden-partition (transform) layouts refuse; identity hive
    # partitioning exports a real spec since r13 (see
    # tests/test_r13_additions.py::test_iceberg_partitioned_export)
    t = VersionedTable(spark, tempfile.mkdtemp(prefix="rdl_ice_guard_"))
    t.overwrite(
        spark.createDataFrame(
            [(1, "2024-01-01"), (2, "2024-02-01")], "k long, d string"
        ).selectExpr("k", "CAST(d AS DATE) AS d"),
        hidden_partition=("month", "d"),
    )
    try:
        t.export_iceberg_metadata()
        raise AssertionError("hidden-partition export should refuse")
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


def test_mann_whitney_doubled_rank_identity(spark):
    """Hand-checked tie case: A=[1,2,2], B=[2,3]. Average ranks: 1→1,
    each 2→3 (positions 2,3,4), 3→5. R_A = 1+3+3 = 7, U_A = R_A −
    n_A(n_A+1)/2 = 1, so the doubled-rank pipeline must yield u2 = 2 —
    pinned against the integer identity 2·rank_avg = 2·cum_before +
    cnt + 1 that x_mann_whitney_u relies on."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    x = spark.createDataFrame(
        [("A", 1), ("A", 2), ("A", 2), ("B", 2), ("B", 3)], "g string, c long"
    )
    grid = x.groupBy("c").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.orderBy("c").rowsBetween(Window.unboundedPreceding, 0)
    gw = grid.select(
        "c", "cnt", (F.sum("cnt").over(w) - F.col("cnt")).alias("cumb")
    )
    sg = x.groupBy("g", "c").agg(F.count(F.lit(1)).alias("cnt_g"))
    r = (
        sg.join(gw, "c")
        .groupBy("g")
        .agg(
            F.sum("cnt_g").alias("n_g"),
            F.sum(F.col("cnt_g") * (2 * F.col("cumb") + F.col("cnt") + 1)).alias("r2"),
        )
        .select("g", (F.col("r2") - F.col("n_g") * (F.col("n_g") + 1)).alias("u2"))
    )
    got = {row["g"]: row["u2"] for row in r.collect()}
    assert got == {"A": 2, "B": 2 * 3 * 2 - 2}  # U_A + U_B = n_A*n_B


def test_ks_supremum_between_jumps_needs_full_grid(spark):
    """The D supremum can sit at a value where only the OTHER sample
    jumps: A=[1,10], B=[2,3,4]. At v=4: F_A=1/2, F_B=1 → |diff|=1/2 is
    the max, but 4 is not an A value — a scan over A's own jump points
    (v=1: |1/2−0|=1/2 ... v=10: 0) would find it only by luck at v=1;
    shift A to [0,10] and own-points-only gives 1/2 at v=0 vs the true
    D=1 nowhere visible. Pin: the crossed-grid computation equals the
    brute-force max over ALL distinct values."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    x = spark.createDataFrame(
        [("A", 0), ("A", 10), ("B", 2), ("B", 3), ("B", 4)], "g string, c long"
    )
    grid = x.groupBy("c").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.orderBy("c").rowsBetween(Window.unboundedPreceding, 0)
    gw = grid.select("c", F.sum("cnt").over(w).alias("cum_all"))
    pri = x.select("g").distinct()
    sg = x.groupBy("g", "c").agg(F.count(F.lit(1)).alias("cnt_g"))
    fg = (
        gw.crossJoin(pri).join(sg, ["g", "c"], "left").fillna(0, subset=["cnt_g"])
    )
    wp = Window.partitionBy("g").orderBy("c").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cums = fg.select(
        "g",
        "cum_all",
        F.sum("cnt_g").over(wp).alias("cum_g"),
        F.sum("cnt_g").over(Window.partitionBy("g")).alias("n_g"),
        F.max("cum_all").over(Window.partitionBy()).alias("n"),
    )
    dnum = cums.select(
        "g",
        F.abs(
            (F.col("n") - F.col("n_g")) * F.col("cum_g")
            - F.col("n_g") * (F.col("cum_all") - F.col("cum_g"))
        ).alias("d"),
    ).groupBy("g").agg(F.max("d").alias("d_num"))
    got = {r["g"]: r["d_num"] for r in dnum.collect()}
    # n_A=2, n_B=3: at v∈{2,3}: cum_A=1, cum_B∈{1,2} → |3·1−2·cum_B| max
    # at v=4 (cum_B=3): |3·1−2·3| = 3 → D = 3/6 = 1/2, found ONLY
    # because v=4 (a B-only value) is in A's grid walk.
    assert got["A"] == 3 and got["B"] == 3


def test_mad_lower_median_convention(spark):
    """Even-count groups take the LOWER median (min v with 2·cum ≥ n) on
    both the value and the deviation walk — pinned on [1,3,5,100]:
    median = 3 (not 4), deviations |x−3| = [2,0,2,97] → MAD = 2."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    x = spark.createDataFrame([(1,), (3,), (5,), (100,)], "c long")
    vg = x.groupBy("c").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.orderBy("c").rowsBetween(Window.unboundedPreceding, 0)
    med = (
        vg.select("c", F.sum("cnt").over(w).alias("cw"),
                  F.sum("cnt").over(Window.partitionBy()).alias("n"))
        .agg(F.min(F.when(2 * F.col("cw") >= F.col("n"), F.col("c"))).alias("m"))
        .first()["m"]
    )
    assert med == 3
    dev = x.select(F.abs(F.col("c") - F.lit(med)).alias("d"))
    dg = dev.groupBy("d").agg(F.count(F.lit(1)).alias("cnt"))
    wd = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    mad = (
        dg.select("d", F.sum("cnt").over(wd).alias("cw"),
                  F.sum("cnt").over(Window.partitionBy()).alias("n"))
        .agg(F.min(F.when(2 * F.col("cw") >= F.col("n"), F.col("d"))).alias("m"))
        .first()["m"]
    )
    assert mad == 2


def test_pit_frame_excludes_same_timestamp_rows(spark):
    """The leakage guard: a purchase may not see ANY row at its own
    (ts, event_id) or later — including a same-timestamp event with a
    higher event_id. Events (us, id): (10,1 view), (20,2 view),
    (20,3 purchase), (20,4 view): the purchase's n_before must be 2
    (ids 1,2), never 3 — id 4 shares its timestamp but sorts after."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    e = spark.createDataFrame(
        [(1, 7, "view", 10), (2, 7, "view", 20), (3, 7, "purchase", 20),
         (4, 7, "view", 20)],
        "event_id long, user_id long, event_type string, us long",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    got = (
        e.select("event_id", "event_type", F.count(F.lit(1)).over(w).alias("n_before"))
        .where(F.col("event_type") == "purchase")
        .first()
    )
    assert got["n_before"] == 2


def test_contribution_bridge_identity_reconciles(spark):
    """ΔRev = Δn·AOV₀ + n₀·ΔAOV + Δn·ΔAOV is an algebraic identity;
    with floor-e2 quantization the three effects must reconcile to the
    delta within 3 cents (one floor per term)."""
    import importlib

    m = importlib.import_module("__spark_entry__")
    df = m.queries()["x_contribution_bridge"](spark, "/root/testdata/sf0.001")
    bad = df.where(
        F.abs(
            F.col("delta_rev_e2")
            - (
                F.col("volume_effect_e2")
                + F.col("rate_effect_e2")
                + F.col("interaction_e2")
            )
        )
        > 3
    ).count()
    assert bad == 0


def test_abc_boundary_is_integer_exact(spark):
    """A part whose cumulative revenue lands EXACTLY on 70.000% is class
    A (10·cum ≤ 7·total is inclusive): revenues [70, 20, 10] → the first
    part's cum is exactly 70% of 100 and must classify A; the second
    (cum 90%) exactly on the B edge must classify B."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    parts = spark.createDataFrame([(1, 70), (2, 20), (3, 10)], "pk long, c long")
    w = Window.orderBy(F.desc("c"), "pk").rowsBetween(Window.unboundedPreceding, 0)
    classed = parts.select(
        "pk",
        F.sum("c").over(w).alias("cum"),
        F.sum("c").over(Window.partitionBy()).alias("total"),
    ).select(
        "pk",
        F.when(10 * F.col("cum") <= 7 * F.col("total"), "A")
        .when(10 * F.col("cum") <= 9 * F.col("total"), "B")
        .otherwise("C")
        .alias("abc"),
    )
    got = {r["pk"]: r["abc"] for r in classed.collect()}
    assert got == {1: "A", 2: "B", 3: "C"}
