"""t-digest mergeable quantile sketch: rank-error contract, bit-level
determinism, merge-vs-monolithic consistency, monotonicity."""

import numpy as np
from pyspark.sql import functions as F

from retail_datalakehouse_spark.operators.tdigest import (
    build_tdigest,
    merge_tdigest,
    quantiles_from_digest,
)

QS = [0.01, 0.25, 0.5, 0.75, 0.99]


def _lineitem_prices(spark):
    return (
        spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .select(F.col("l_extendedprice").alias("v"))
    )


def _rank_errors(spark, df, estimates):
    """|actual rank of estimate - target rank| / N per quantile."""
    vals = np.sort(np.array([r.v for r in df.collect()], dtype=np.float64))
    n = len(vals)
    errs = {}
    for r in estimates:
        rank = np.searchsorted(vals, r.estimate, side="right")
        errs[r.q] = abs(rank - r.q * n) / n
    return errs


def test_rank_error_contract(spark):
    df = _lineitem_prices(spark)
    d = merge_tdigest(build_tdigest(df, "v"))
    est = quantiles_from_digest(d, QS).collect()
    errs = _rank_errors(spark, df, est)
    assert errs[0.01] <= 0.005 and errs[0.99] <= 0.005, errs  # tail precision
    for q in (0.25, 0.5, 0.75):
        assert errs[q] <= 0.015, errs


def test_determinism_bit_identical(spark):
    df = _lineitem_prices(spark).repartition(7)
    a = merge_tdigest(build_tdigest(df, "v")).collect()[0]
    b = merge_tdigest(build_tdigest(df.repartition(3), "v")).collect()[0]
    # content-hash sharding => identical centroids under ANY layout
    assert a.means == b.means and a.weights == b.weights
    assert a.n == b.n and a.lo == b.lo and a.hi == b.hi


def test_merge_of_partial_builds_stays_in_bound(spark):
    """Digest-of-union vs merge-of-part-digests: both must satisfy the
    rank-error contract (t-digest merge is bound-preserving, not
    bit-equal to the monolithic build)."""
    df = _lineitem_prices(spark)
    part1 = df.where(F.col("v") < 30000)
    part2 = df.where(F.col("v") >= 30000)
    merged = merge_tdigest(
        build_tdigest(part1, "v").unionByName(build_tdigest(part2, "v"))
    )
    est = quantiles_from_digest(merged, QS).collect()
    errs = _rank_errors(spark, df, est)
    assert max(errs.values()) <= 0.02, errs


def test_quantile_estimates_monotone_and_clamped(spark):
    df = _lineitem_prices(spark)
    d = merge_tdigest(build_tdigest(df, "v"))
    row = d.collect()[0]
    qs = [i / 20.0 for i in range(21)]
    est = [r.estimate for r in quantiles_from_digest(d, qs).orderBy("q").collect()]
    assert est == sorted(est)
    assert est[0] >= row.lo and est[-1] <= row.hi
    # extreme quantiles hit the exact min/max
    assert abs(est[0] - row.lo) < 1e-9 and abs(est[-1] - row.hi) < 1e-9


def test_compress_invariants_numpy_level():
    """Kernel-level invariants with no Spark in the loop: weight
    conservation (exact — integer weights), sorted centroid means,
    centroid count bounded by the k1 band count (~delta/2 + 2),
    tails kept relatively fine-grained
    (first/last centroid weight 1 for distinct values)."""
    import numpy as np

    from retail_datalakehouse_spark.operators.tdigest import _compress

    rng = np.random.default_rng(42)
    for n in (1, 2, 10, 1000, 50000):
        v = np.sort(rng.normal(size=n) * 1000.0)
        m, w = _compress(v, np.ones_like(v), delta=100)
        assert w.sum() == float(n)  # integer weights sum exactly
        assert np.all(np.diff(m) >= 0)
        assert len(m) <= 2 * 100 + 2
        if n >= 1000:
            # k1 keeps tails RELATIVELY fine: the outermost clusters
            # hold <=0.2% of N (vs n/len(m) ~ 2% for an equi-weight cut)
            assert w[0] <= max(1.0, 0.002 * n)
            assert w[-1] <= max(1.0, 0.002 * n)
        # weighted mean preserved to fp accumulation accuracy
        assert abs((m * w).sum() - v.sum()) < 1e-6 * max(1.0, abs(v.sum()))


def test_grouped_digest_matches_global_per_group(spark):
    """Each group's merged digest must equal the GLOBAL build run on
    that group's rows alone — grouping only partitions the work."""
    from pyspark.sql import functions as F

    from retail_datalakehouse_spark.operators.tdigest import (
        build_tdigest,
        build_tdigest_grouped,
        merge_tdigest,
        merge_tdigest_grouped,
    )

    df = (
        spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .select(F.col("l_returnflag").alias("flag"),
                F.col("l_extendedprice").alias("v"))
    )
    grouped = {
        r.flag: r
        for r in merge_tdigest_grouped(
            build_tdigest_grouped(df, "v", ["flag"], num_shards=16), ["flag"]
        ).collect()
    }
    for flag in grouped:
        solo = merge_tdigest(
            build_tdigest(df.where(F.col("flag") == flag), "v", num_shards=16)
        ).collect()[0]
        g = grouped[flag]
        assert g.means == solo.means and g.weights == solo.weights
        assert g.n == solo.n and g.lo == solo.lo and g.hi == solo.hi
