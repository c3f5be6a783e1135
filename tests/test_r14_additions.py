"""Round-14 additions: the distributed two-pass global rank that
replaced the global-ntile family's unpartitioned windows (VERDICT r13
item 2). The helper must reproduce SQL row_number/ntile/percent_rank
bit-for-bit under a total order while keeping every window in the plan
partitioned."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from retail_datalakehouse_spark.operators.ranking import (
    attach_global_rank,
    ntile_from_rank,
    percent_rank_from_rank,
)


def _spread_df(spark, n=997):
    # deterministic, shuffled-looking keys: (id*7919) % n is a bijection
    # on [0, n) for prime n, so ranks hit every value exactly once
    return spark.range(n).select(
        F.col("id").alias("k"),
        ((F.col("id") * 7919) % n).alias("v"),
    )


def test_attach_global_rank_matches_window_row_number(spark):
    df = _spread_df(spark).repartition(7)
    got = attach_global_rank(df, ["v", "k"], rank_col="r").select(
        "k", "v", "r"
    )
    want = df.select(
        "k", "v", F.row_number().over(Window.orderBy("v", "k")).cast("long").alias("r")
    )
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_attach_global_rank_descending_and_total(spark):
    df = _spread_df(spark, n=101)
    got = attach_global_rank(
        df, [("v", "desc"), "k"], rank_col="r", total_col="c"
    )
    rows = {row["v"]: (row["r"], row["c"]) for row in got.collect()}
    assert all(c == 101 for _, c in rows.values())
    # v is a bijection on [0,101): rank under v DESC is 101 - v
    assert all(r == 101 - v for v, (r, _) in rows.items())


def test_ntile_and_percent_rank_arithmetic_match_window_fns(spark):
    # n=103 rows, 4 buckets: 103 = 4*25 + 3, so buckets sized 26,26,26,25
    # — exercises the uneven ceil/floor split of the NTILE definition
    df = _spread_df(spark, n=103)
    base = attach_global_rank(
        df, ["v", "k"], rank_col="r", total_col="c"
    )
    got = base.select(
        "k",
        ntile_from_rank("r", "c", 4).cast("long").alias("q"),
        F.round(percent_rank_from_rank("r", "c"), 9).alias("pr"),
    )
    w = Window.orderBy("v", "k")
    want = df.select(
        "k",
        F.ntile(4).over(w).cast("long").alias("q"),
        F.round(F.percent_rank().over(w), 9).alias("pr"),
    )
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_ntile_more_buckets_than_rows(spark):
    # c < n: every bucket holds at most one row, bucket == rank
    df = spark.range(3).select(F.col("id").alias("k"), F.col("id").alias("v"))
    out = attach_global_rank(df, ["v"], rank_col="r", total_col="c").select(
        "k", ntile_from_rank("r", "c", 10).alias("q")
    )
    assert {(row["k"], row["q"]) for row in out.collect()} == {(0, 1), (1, 2), (2, 3)}


def test_percent_rank_single_row_is_zero(spark):
    df = spark.range(1).select(F.col("id").alias("v"))
    out = attach_global_rank(df, ["v"], rank_col="r", total_col="c").select(
        percent_rank_from_rank("r", "c").alias("pr")
    )
    assert out.collect()[0]["pr"] == 0.0


def test_chained_ranks_stay_consistent(spark):
    """Regression for the sf1 corruption the first (spark_partition_id)
    design exhibited: when attach_global_rank runs on a frame that
    already went through attach_global_rank, differently-pruned copies
    of the subtree must still agree on bucket ids — with literal
    cutpoints the bucket is a pure row function, so chained ranks can
    never mint duplicate or missing rank values."""
    df = _spread_df(spark, n=2999)
    r1 = attach_global_rank(df, ["v", "k"], rank_col="r1", total_col="c")
    r2 = attach_global_rank(r1, [("v", "desc"), "k"], rank_col="r2")
    out = r2.select("k", "v", "r1", "r2")
    # every rank value appears exactly once, both columns
    assert out.groupBy("r1").count().filter("count > 1").count() == 0
    assert out.groupBy("r2").count().filter("count > 1").count() == 0
    # and the two orders are mirror images on a bijective key
    assert out.filter((F.col("r1") + F.col("r2")) != 3000).count() == 0


def test_global_rank_plan_has_no_unpartitioned_window(spark):
    import sys

    sys.path.insert(0, ".")
    from tools.explain_audit import _unpartitioned_window_count

    df = attach_global_rank(_spread_df(spark), ["v", "k"], rank_col="r")
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan =="
    )[0]
    assert _unpartitioned_window_count(plan) == 0
    assert "hashpartitioning(_rp_b" in plan


def test_expire_iceberg_snapshots_guards(spark, tmp_path):
    """Expiry edge contracts: keep_last < 1 refuses (current must
    survive), un-exported tables refuse, expiring more than exists is a
    no-op that does NOT mint a new metadata version."""
    import os

    import pytest as _pytest

    from retail_datalakehouse_spark.sources.table_format import VersionedTable

    t = VersionedTable(spark, str(tmp_path / "tbl"))
    t.overwrite(spark.createDataFrame([(1, "a")], "k long, v string"))
    with _pytest.raises(ValueError, match="no exported iceberg metadata"):
        t.expire_iceberg_snapshots()
    t.export_iceberg_metadata()
    with _pytest.raises(ValueError, match="keep_last"):
        t.expire_iceberg_snapshots(keep_last=0)
    p1 = t.expire_iceberg_snapshots(keep_last=5)  # nothing to expire
    assert os.path.basename(p1) == "v1.metadata.json"  # no new version


def test_delta_checkpoint_guards_and_seeding(spark, tmp_path):
    """Checkpoint contracts: no log -> refuse; truncate without a
    checkpoint -> refuse; checkpoint-only log (ALL JSONs gone) still
    reads via _last_checkpoint seeding; partitioned tables carry their
    partitionValues through the checkpoint parquet round-trip."""
    import os

    import pytest as _pytest

    from retail_datalakehouse_spark.sources.delta_import import (
        read_delta_snapshot,
    )
    from retail_datalakehouse_spark.sources.table_format import VersionedTable

    t = VersionedTable(spark, str(tmp_path / "tbl"))
    t.overwrite(
        spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20), (3, "a", 30)], "k long, p string, v long"
        ),
        partition_by=["p"],
    )
    with _pytest.raises(ValueError, match="no exported delta log"):
        t.export_delta_checkpoint()
    with _pytest.raises(ValueError, match="requires a checkpoint"):
        t.truncate_delta_log()
    t.export_delta_log()
    cp = t.export_delta_checkpoint()
    assert os.path.exists(cp)

    # simulate aggressive retention: delete EVERY json commit — the
    # reader must seed entirely from the checkpoint
    log_dir = os.path.join(t.path, "_delta_log")
    for fn in list(os.listdir(log_dir)):
        if fn.endswith(".json") and fn[:20].isdigit():
            os.remove(os.path.join(log_dir, fn))
    got = read_delta_snapshot(spark, t.path)
    assert sorted(map(tuple, got.select("k", "p", "v").collect())) == [
        (1, "a", 10),
        (2, "b", 20),
        (3, "a", 30),
    ]
    # metadata-borne partition pruning still works off the checkpoint
    pruned = read_delta_snapshot(spark, t.path, partition_filter={"p": "a"})
    assert pruned.count() == 2
