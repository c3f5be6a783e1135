"""Property-based tests (hypothesis) for algebraic invariants — SURVEY §5.5:
merge idempotency, dedup idempotency, filter/union commutation, window-sum
vs group-sum totals."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import Window
from pyspark.sql import functions as F

from retail_datalakehouse_spark.operators.dedup import dedup_keep_first
from retail_datalakehouse_spark.operators.merge import merge_upsert

ROWS = st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 5), st.integers(-1000, 1000)),
    min_size=0,
    max_size=40,
)

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


def _df(spark, rows):
    return spark.createDataFrame(
        [(i, k, v) for i, (k, _, v) in enumerate(rows)] or [(0, 0, 0)], ["id", "key", "v"]
    )


@given(rows=ROWS)
@SETTINGS
def test_dedup_idempotent(spark, rows):
    df = _df(spark, rows)
    once = dedup_keep_first(df, ["key"], ["id"])
    twice = dedup_keep_first(once, ["key"], ["id"])
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


@given(rows=ROWS, upd=ROWS)
@SETTINGS
def test_merge_idempotent_and_key_unique(spark, rows, upd):
    target = dedup_keep_first(_df(spark, rows), ["key"], ["id"])
    updates = dedup_keep_first(_df(spark, upd), ["key"], ["id"])
    once = merge_upsert(target, updates, ["key"])
    twice = merge_upsert(once, updates, ["key"])
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))
    # post-merge keys are unique
    n_keys = once.select("key").distinct().count()
    assert once.count() == n_keys


@given(rows=ROWS, threshold=st.integers(-500, 500))
@SETTINGS
def test_filter_union_commutes(spark, rows, threshold):
    df = _df(spark, rows)
    half_a = df.filter(F.col("key") % 2 == 0)
    half_b = df.filter(F.col("key") % 2 == 1)
    pre = half_a.filter(F.col("v") > threshold).unionByName(half_b.filter(F.col("v") > threshold))
    post = half_a.unionByName(half_b).filter(F.col("v") > threshold)
    assert sorted(map(tuple, pre.collect())) == sorted(map(tuple, post.collect()))


@given(rows=ROWS)
@SETTINGS
def test_window_sum_equals_group_sum(spark, rows):
    """The final running-total per key equals the group total (W3 ≡ A1)."""
    df = _df(spark, rows)
    w = Window.partitionBy("key").orderBy("id").rowsBetween(Window.unboundedPreceding, 0)
    last_running = (
        df.withColumn("run", F.sum("v").over(w))
        .groupBy("key")
        .agg(F.max_by("run", "id").alias("total"))
    )
    group_total = df.groupBy("key").agg(F.sum("v").alias("total"))
    assert sorted(map(tuple, last_running.collect())) == sorted(
        map(tuple, group_total.collect())
    )


@given(
    vals=st.lists(st.floats(-100, 100, allow_nan=False, width=32), min_size=0, max_size=25),
    w=st.sampled_from([0.3, 1.0, 2.5]),
)
@SETTINGS
def test_binned_band_join_matches_naive(spark, vals, w):
    """The floor(v/w) bin rewrite of |a-b| <= w finds EXACTLY the naive
    theta-join pairs for arbitrary values and band widths (adjacent-bin
    coverage is sufficient and non-duplicating)."""
    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)] or [(0, 0.0)], ["k", "v"]
    )
    binned = df.withColumn("bin", F.floor(F.col("v") / w).cast("long"))
    probes = binned.withColumn(
        "pb", F.explode(F.array(F.col("bin") - 1, F.col("bin"), F.col("bin") + 1))
    ).select(F.col("k").alias("k1"), F.col("v").alias("v1"), "pb")
    build = binned.select(F.col("k").alias("k2"), F.col("v").alias("v2"), "bin")
    fast = {
        (r["k1"], r["k2"])
        for r in probes.join(build, probes.pb == build.bin)
        .filter((F.col("k1") < F.col("k2")) & (F.abs(F.col("v1") - F.col("v2")) <= w))
        .collect()
    }
    naive = {
        (i, j)
        for i, a in enumerate(vals)
        for j, b in enumerate(vals)
        if i < j and abs(a - b) <= w
    }
    assert fast == naive
