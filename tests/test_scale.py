"""Scale-behavior evidence: pins the runtime mechanisms SCALE.md claims —
AQE skew-join splitting under a synthetic hot key — so the 100 TB design
story is a test, not prose (verdict r5 item 5c)."""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import functions as F


@contextmanager
def _confs(spark, **kv):
    """Set session confs for a test, restoring previous values after."""
    old = {}
    for k, v in kv.items():
        key = k.replace("__", ".")
        try:
            old[key] = spark.conf.get(key)
        except Exception:  # noqa: BLE001 — unset conf
            old[key] = None
        spark.conf.set(key, v)
    try:
        yield
    finally:
        for key, v in old.items():
            if v is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, v)


def test_aqe_splits_skewed_join_partition(spark):
    """A hot join key (83% of the fact rows) must trigger AQE's runtime
    skew-split: the executed plan's SortMergeJoin carries ``skew=true``
    and the job completes without one straggler task owning the hot key.
    This is the engine's documented answer (SCALE.md §skew) for skew that
    salting was not applied to — verify the mechanism actually engages
    under this session's conf shape, not just that the conf is set."""
    with _confs(
        spark,
        **{
            "spark__sql__adaptive__enabled": "true",
            "spark__sql__adaptive__skewJoin__enabled": "true",
            # test-scale thresholds: production defaults (256 MB) scaled to
            # the synthetic data so the SAME code path engages
            "spark__sql__adaptive__skewJoin__skewedPartitionFactor": "2",
            "spark__sql__adaptive__skewJoin__skewedPartitionThresholdInBytes": "64KB",
            "spark__sql__adaptive__advisoryPartitionSizeInBytes": "32KB",
            "spark__sql__adaptive__coalescePartitions__enabled": "false",
            "spark__sql__autoBroadcastJoinThreshold": "-1",
            "spark__sql__shuffle__partitions": "8",
        },
    ):
        big = spark.range(0, 300_000).select(
            F.when(F.col("id") < 250_000, F.lit(0))
            .otherwise(F.col("id") % 100)
            .alias("k"),
            F.col("id").alias("payload"),
        )
        dim = spark.range(0, 100).select(
            F.col("id").alias("k"), F.sha1(F.col("id").cast("string")).alias("attr")
        )
        j = big.join(dim, "k")
        assert len(j.collect()) == 300_000  # correctness unchanged by split
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, f"AQE skew split did not engage:\n{plan[:2000]}"


def test_salting_and_aqe_agree(spark):
    """The two skew answers (manual salting, AQE split) must produce the
    same join result on the same hot-key data."""
    from retail_datalakehouse_spark.operators.skew import salted_join

    big = spark.range(0, 30_000).select(
        (F.col("id") % 3).alias("k"), F.col("id").alias("payload")
    )
    dim = spark.createDataFrame(
        [(0, "x"), (1, "y"), (2, "z")], ["k", "attr"]
    )
    plain = big.join(dim, "k")
    salted = salted_join(big, dim, "k", n_salts=8)
    assert sorted(map(tuple, plain.select("k", "payload", "attr").collect())) == sorted(
        map(tuple, salted.select("k", "payload", "attr").collect())
    )


def test_file_skipping_prunes_and_preserves(spark, sf_dir, tmp_path):
    """skipping_scan must return exactly the full-scan filter result while
    opening a fraction of the files; an out-of-range predicate opens ZERO
    files and returns empty."""
    from retail_datalakehouse_spark.sources.skipping import (
        collect_file_stats,
        skipping_scan,
        write_clustered,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    path = str(tmp_path / "orders_clustered")
    write_clustered(o, path, "o_orderkey", n_files=16)
    stats = collect_file_stats(path, ["o_orderkey"])
    assert len(stats) == 16 and all(s["o_orderkey_min"] is not None for s in stats)
    # files are range-disjoint (clustering worked)
    spans = sorted((s["o_orderkey_min"], s["o_orderkey_max"]) for s in stats)
    assert all(a[1] <= b[0] for a, b in zip(spans, spans[1:]))

    mx = max(s["o_orderkey_max"] for s in stats)
    lo, hi = mx // 10, mx // 10 * 2
    df, n_read, n_total = skipping_scan(spark, path, stats, "o_orderkey", lo, hi)
    expected = sorted(
        map(tuple, o.filter((o.o_orderkey >= lo) & (o.o_orderkey <= hi)).collect())
    )
    assert sorted(map(tuple, df.collect())) == expected
    assert 0 < n_read < n_total / 2

    empty, n0, _ = skipping_scan(spark, path, stats, "o_orderkey", mx + 10, mx + 20)
    assert n0 == 0 and empty.count() == 0
