"""Round-15 optimization tests: the byte-gated / shared fan-out semantics
(operators/parallelism.py) that fixed the r14 fan_out regressions."""

from __future__ import annotations

from pyspark.sql import functions as F

from retail_datalakehouse_spark.operators.parallelism import (
    fan_out,
    fan_out_shared,
)


def _narrow(spark):
    # one partition, tiny payload — the shape the fan-out helpers repair
    return spark.range(0, 100, 1, 1).select(
        F.col("id"), F.concat(F.lit("w"), F.col("id")).alias("text")
    )


def test_fan_out_widens_narrow_input(spark):
    df = _narrow(spark)
    assert df.rdd.getNumPartitions() == 1
    out = fan_out(df, min_partitions=4)
    assert out.rdd.getNumPartitions() >= 4
    assert out.count() == 100


def test_fan_out_noop_when_parallel_enough(spark):
    df = spark.range(0, 100, 1, 8)
    out = fan_out(df, min_partitions=4)
    # already parallel: the SAME frame comes back, no repartition inserted
    assert out is df


def test_fan_out_min_bytes_gate_skips_tiny_input(spark):
    df = _narrow(spark)
    # ~100 short rows is far below a 1 MiB gate: light kernels stay serial
    out = fan_out(df, min_partitions=4, min_bytes=1 << 20)
    assert out is df
    # and with the gate cleared (0 = always), the fan fires again
    assert fan_out(df, min_partitions=4).rdd.getNumPartitions() >= 4


def test_fan_out_shared_materializes_once(spark):
    df = _narrow(spark)
    out = fan_out_shared(df, min_partitions=4)
    assert out.rdd.getNumPartitions() >= 4
    # localCheckpoint truncates lineage: branches read the shuffled blocks
    # instead of re-instantiating a RoundRobin exchange per subtree
    assert out.rdd.toDebugString().count(b"ShuffledRowRDD") == 0
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "LogicalRDD" in plan or "ExistingRDD" in plan
    # row content unchanged
    assert out.count() == 100
    assert out.agg(F.sum("id")).first()[0] == 4950


def test_fan_out_shared_noop_below_gate(spark):
    df = _narrow(spark)
    out = fan_out_shared(df, min_partitions=4, min_bytes=1 << 20)
    assert out is df


def test_global_rank_string_key_with_substitution_marker(spark):
    """ADVICE r14 (medium): a sampled string cutpoint containing '${...}'
    must NOT be rendered into F.expr text (Spark variable substitution
    would silently rewrite it). _sql_lit now raises so _bucket_expr falls
    back to the py4j Column builder; global ranks stay correct."""
    import pytest

    from pyspark.sql import Window
    from retail_datalakehouse_spark.operators.ranking import (
        _sql_lit,
        attach_global_rank,
    )

    with pytest.raises(TypeError):
        _sql_lit("${x}")
    assert _sql_lit("plain") == "'plain'"

    vals = [f"${{k{i}}}" for i in range(40)] + [f"v{i:02d}" for i in range(40)]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    got = {
        r["s"]: r["_grank"]
        for r in attach_global_rank(df, ["s"], num_buckets=4).collect()
    }
    want = {
        r["s"]: r["rn"]
        for r in df.withColumn(
            "rn", F.row_number().over(Window.orderBy("s"))
        ).collect()
    }
    assert got == want
