"""Advanced scale-path queries: binned band joins, runtime bloom filters,
mergeable sketches, quantized ANN, ranking/scoring text ops, unpivot,
histograms, and statistical anomaly detection.

These target the 100 TB design brief directly: every operator here is the
scale-safe formulation of something a naive engine does quadratically or
with an unmergeable single-pass structure —

- ``x_binned_band_join``: a pure |a-b| <= w theta-join with NO equi key,
  rewritten as an equi-join on floor(v/w) bins (explode one side to the 3
  candidate bins). A cartesian BroadcastNestedLoopJoin becomes a hash
  shuffle join: O(n^2) -> O(n + candidate pairs).
- ``x_runtime_bloom_join``: Spark's runtime bloom-filter injection
  (InjectRuntimeFilter) — the selective dimension side builds a bloom
  filter that prunes the fact scan BEFORE the shuffle, the same job a
  Delta/Iceberg DPP does for partition keys but for arbitrary join keys.
- ``x_hll_sketch_union``: two-phase approximate COUNT DISTINCT via Apache
  DataSketches HLL — per-slice sketches are MERGEABLE, so a 100 TB profile
  job computes per-partition sketches map-side and unions k bytes, never
  re-scanning (the exact pass in ``a2_count_distinct`` shuffles every
  distinct value).
- ``l3_sq8_topk``: int8 scalar-quantized ANN — 4x smaller vectors for the
  scan-bound candidate pass, exact float rescoring only on the top
  candidates (memory-bandwidth is the binding constraint at corpus scale).
- ``l4_bm25`` / ``l4_unigram_loglik``: corpus-statistics text scoring
  (search ranking, LM-based quality filtering) as two-phase aggregations +
  broadcast of the (bounded) statistics table.

Reference parity: the reference has no analytics engine (SURVEY §0); these
extend the lakehouse the way its Athena/Glue consumers would query it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import register
from .helpers import T, sql_dsum

# --------------------------------------------------------------- unpivot


@register(
    "x_unpivot",
    oracle="""
WITH wide AS (
  SELECT o_custkey,
         CAST(COUNT(*) FILTER (WHERE o_orderstatus='F') AS BIGINT) AS status_F,
         CAST(COUNT(*) FILTER (WHERE o_orderstatus='O') AS BIGINT) AS status_O,
         CAST(COUNT(*) FILTER (WHERE o_orderstatus='P') AS BIGINT) AS status_P
  FROM orders GROUP BY o_custkey)
SELECT o_custkey, status_col, n_orders
FROM wide UNPIVOT (n_orders FOR status_col IN (status_F, status_O, status_P))
""",
    tags=("A6",),
)
def x_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide->long melt (the inverse of ``x_pivot``): conditional-agg a wide
    per-customer status matrix, then ``unpivot`` back to (key, variable,
    value) rows. Narrow transform after the agg — no extra shuffle."""
    o = T(spark, sf_dir, "orders")
    wide = o.groupBy("o_custkey").agg(
        *[
            F.sum(F.when(F.col("o_orderstatus") == s, 1).otherwise(0))
            .cast("long")
            .alias(f"status_{s}")
            for s in ("F", "O", "P")
        ]
    )
    return wide.unpivot(
        ["o_custkey"], ["status_F", "status_O", "status_P"], "status_col", "n_orders"
    )


# ------------------------------------------------------------- histogram


@register(
    "x_histogram",
    oracle=f"""
SELECT CAST(FLOOR(o_totalprice / 25000.0) AS BIGINT) AS bucket,
       COUNT(*) AS n_orders,
       {sql_dsum('o_totalprice')} AS bucket_revenue
FROM orders
GROUP BY CAST(FLOOR(o_totalprice / 25000.0) AS BIGINT)
""",
    tags=("A1",),
)
def x_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-width histogram (25k-wide buckets over order totals): the
    profile primitive for choosing partition bounds / detecting skew.
    floor() keeps bucketing in codegen; one two-phase agg, no sort."""
    o = T(spark, sf_dir, "orders")
    from .helpers import dsum

    return (
        o.withColumn("bucket", F.floor(F.col("o_totalprice") / 25000.0).cast("long"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("bucket_revenue"),
        )
    )


# --------------------------------------------------------- z-score anomaly


_Z_SQL_STATS = """
  SELECT c_nationkey, COUNT(*) AS n,
         CAST(SUM(CAST(c_acctbal AS DECIMAL(25,6))) AS DOUBLE) AS s1,
         CAST(SUM(CAST(c_acctbal * c_acctbal AS DECIMAL(30,10))) AS DOUBLE) AS s2
  FROM customer GROUP BY c_nationkey
"""


@register(
    "x_anomaly_zscore",
    oracle=f"""
WITH stats AS ({_Z_SQL_STATS})
SELECT c_custkey, c.c_nationkey, c_acctbal,
       ROUND((c_acctbal - s1 / n) / sqrt(s2 / n - (s1 / n) * (s1 / n)), 4) AS z
FROM customer c JOIN stats s ON c.c_nationkey = s.c_nationkey
WHERE abs((c_acctbal - s1 / n) / sqrt(s2 / n - (s1 / n) * (s1 / n))) > 1.6
""",
    tags=("A1", "J2"),
)
def x_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score outlier detection (anomalous account balances per
    nation). Group moments (n, sum, sum-of-squares) are ONE two-phase agg —
    sum-of-squares makes variance single-pass — then broadcast back; no
    window over the full table, no second scan. Decimal-exact sums keep the
    moments bit-identical across engines."""
    c = T(spark, sf_dir, "customer").select("c_custkey", "c_nationkey", "c_acctbal")
    stats = c.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("c_acctbal").cast("decimal(25,6)")).cast("double").alias("s1"),
        F.sum((F.col("c_acctbal") * F.col("c_acctbal")).cast("decimal(30,10)"))
        .cast("double")
        .alias("s2"),
    )
    j = c.join(F.broadcast(stats), "c_nationkey")
    mean = F.col("s1") / F.col("n")
    z = (F.col("c_acctbal") - mean) / F.sqrt(F.col("s2") / F.col("n") - mean * mean)
    return (
        j.filter(F.abs(z) > 1.6)
        .select("c_custkey", "c_nationkey", "c_acctbal", F.round(z, 4).alias("z"))
    )


# ------------------------------------------------------ binned band join


@register(
    "x_binned_band_join",
    oracle="""
SELECT c1.c_custkey AS k1, c2.c_custkey AS k2,
       ROUND(abs(c1.c_acctbal - c2.c_acctbal), 2) AS bal_diff
FROM customer c1 JOIN customer c2
  ON c1.c_custkey < c2.c_custkey
 AND abs(c1.c_acctbal - c2.c_acctbal) <= 0.5
""",
    tags=("J8",),
)
def x_binned_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure band join (|a.bal - b.bal| <= w) with NO equi key — naively a
    cartesian BroadcastNestedLoopJoin, O(n^2) at scale. Rewritten: bin both
    sides by floor(v/w); any qualifying pair sits in the same or adjacent
    bins, so exploding ONE side to its 3 candidate bins turns the theta-join
    into a hash equi-join on bin + a residual predicate. 3x replication of
    one side buys a shuffle-partitionable plan; each qualifying pair is
    emitted exactly once (the probe targets the build row's own bin)."""
    w = 0.5
    c = T(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    binned = c.withColumn("bin", F.floor(F.col("c_acctbal") / w).cast("long"))
    probes = binned.withColumn(
        "probe_bin",
        F.explode(F.array(F.col("bin") - 1, F.col("bin"), F.col("bin") + 1)),
    ).select(
        F.col("c_custkey").alias("k1"),
        F.col("c_acctbal").alias("bal1"),
        "probe_bin",
    )
    build = binned.select(
        F.col("c_custkey").alias("k2"), F.col("c_acctbal").alias("bal2"), "bin"
    )
    return (
        probes.join(build, probes.probe_bin == build.bin)
        .filter(
            (F.col("k1") < F.col("k2"))
            & (F.abs(F.col("bal1") - F.col("bal2")) <= w)
        )
        .select(
            "k1", "k2", F.round(F.abs(F.col("bal1") - F.col("bal2")), 2).alias("bal_diff")
        )
    )


# ---------------------------------------------------- runtime bloom join


@register(
    "x_runtime_bloom_join",
    oracle=f"""
SELECT o.o_orderpriority,
       COUNT(*) AS n_items,
       {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderpriority = '1-URGENT' AND o.o_orderstatus = 'F'
GROUP BY o.o_orderpriority
""",
    tags=("J1", "P2"),
)
def x_runtime_bloom_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime bloom-filter pruned fact join: the selective dimension side
    (urgent finished orders) builds a bloom filter over its join keys that
    is pushed into the fact scan BEFORE the shuffle
    (spark.sql.optimizer.runtime.bloomFilter.* / InjectRuntimeFilter) —
    row-level DPP for arbitrary keys. At 100 TB this cuts the shuffled fact
    rows to ~the selectivity of the dim predicate. The result is persisted
    under the bloom configs so later collects replay the materialized
    partitions (configs are session-scoped; thresholds are lowered because
    the local test corpus is far below the 10 GB default application-side
    threshold — on a real cluster the defaults fire on their own)."""
    from .helpers import dsum

    saved_bloom = spark.conf.get(
        "spark.sql.optimizer.runtime.bloomFilter.enabled", "true"
    )
    saved_thresh = spark.conf.get(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "10GB",
    )
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
    )
    # InjectRuntimeFilter only fires for probably-shuffle joins: a broadcast-
    # able creation side suppresses it (the broadcast join IS the filter).
    # At test scale the dim side fits the 10 MB broadcast default, so force a
    # shuffle join while materializing, then restore the session values —
    # the result is persisted first, so later collects replay materialized
    # partitions and none of these configs leak into subsequent queries.
    saved_abt = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        l = T(spark, sf_dir, "lineitem")
        o = T(spark, sf_dir, "orders").filter(
            (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_orderstatus") == "F")
        )
        res = (
            l.join(o, l.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n_items"),
                dsum(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).alias(
                    "revenue"
                ),
            )
        )
        res = res.persist()
        res.count()  # materialize while the bloom configs are in force
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved_abt)
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", saved_bloom)
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            saved_thresh,
        )
    return res


# ------------------------------------------------------- HLL sketch union


@register(
    "x_hll_sketch_union",
    oracle=None,  # rows-only: sketch estimates are engine-specific
    tags=("A3",),
)
def x_hll_sketch_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable approximate COUNT DISTINCT via DataSketches HLL: phase 1
    builds one sketch of active customers PER ORDER-YEAR (map-side partial
    agg), phase 2 merges the year sketches with hll_union_agg into the
    global estimate WITHOUT rescanning. This is the 100 TB profile-job
    shape: per-partition sketches are k bytes each; the exact alternative
    re-shuffles every distinct value. Error bound pinned by
    tests/test_advanced.py (lgConfigK=12 -> ~1.6% rse)."""
    o = T(spark, sf_dir, "orders").select(
        F.year("o_orderdate").alias("yr"), "o_custkey"
    )
    per_year = o.groupBy("yr").agg(
        F.hll_sketch_agg("o_custkey", 12).alias("sk")
    )
    yearly = per_year.select(
        F.col("yr").cast("string").alias("scope"),
        F.hll_sketch_estimate("sk").alias("approx_customers"),
    )
    total = per_year.agg(F.hll_union_agg("sk").alias("sk")).select(
        F.lit("total").alias("scope"),
        F.hll_sketch_estimate("sk").alias("approx_customers"),
    )
    return yearly.unionByName(total)


# --------------------------------------------------------- SQ8 quantized ANN


@register(
    "l3_sq8_topk",
    oracle=None,  # rows-only: quantization grid is engine-specific
    tags=("L3",),
)
def l3_sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-quantized (int8) ANN: vectors are mapped to tinyint on a
    symmetric grid (x -> round(127*x/maxabs)), the candidate pass scores
    int8 dot products (4x less memory bandwidth than float32 — the binding
    constraint for a scan-bound 100 TB corpus), and only the top-50
    candidates are rescored with exact float cosine for the final top-10.
    All JVM (transform/zip_with/aggregate folds); the only collects are the
    scalar scale factor and the 1 query vector. Recall vs exact brute force
    pinned by tests/test_advanced.py."""
    emb = T(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    scale = emb.select(
        F.max(
            F.aggregate(
                "embedding", F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x))
            )
        ).alias("s")
    ).collect()[0]["s"]
    qrow = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    q8 = [int(round(127.0 * float(x) / scale)) for x in qrow]

    quant = emb.filter(F.col("vec_id") != 0).withColumn(
        "q",
        F.transform(
            "embedding", lambda x: F.round(F.lit(127.0) * x / F.lit(scale)).cast("int")
        ),
    )
    qlit = F.array(*[F.lit(v) for v in q8])
    approx = quant.withColumn(
        "approx_dot",
        F.aggregate(
            F.zip_with("q", qlit, lambda a, b: a * b), F.lit(0), lambda acc, x: acc + x
        ),
    )
    cand = approx.orderBy(F.desc("approx_dot"), "vec_id").limit(50)

    qf = F.lit([float(x) for x in qrow])
    dot = F.aggregate(
        F.zip_with("embedding", qf, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda col: F.sqrt(  # noqa: E731
        F.aggregate(col, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    qnorm = sum(float(x) * float(x) for x in qrow) ** 0.5
    cos = dot / (norm(F.col("embedding")) * F.lit(qnorm))
    return (
        cand.withColumn("cosine", F.round(cos, 6))
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(10)
        .select("vec_id", "cosine")
    )


# ----------------------------------------------------------------- BM25


_BM25_TERMS = ("join", "window", "spark")


def _bm25_sql() -> str:
    tf = {
        t: f"len(list_filter(toks, t -> t = '{t}'))" for t in _BM25_TERMS
    }
    dfc = ", ".join(
        f"COUNT(*) FILTER (WHERE {tf[t]} > 0) AS df_{t}" for t in _BM25_TERMS
    )
    contribs = " + ".join(
        f"(ln(1 + (n_docs - df_{t} + 0.5) / (df_{t} + 0.5))"
        f" * ({tf[t]} * 2.2) / ({tf[t]} + 1.2 * (0.25 + 0.75 * dl / avgdl)))"
        for t in _BM25_TERMS
    )
    anyhit = " + ".join(tf[t] for t in _BM25_TERMS)
    return f"""
WITH d AS (
  SELECT doc_id, string_split(lower(text), ' ') AS toks,
         len(string_split(lower(text), ' ')) AS dl
  FROM documents),
g AS (
  SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl, {dfc}
  FROM d)
SELECT doc_id, CAST(ROUND(({contribs}) * 10000) AS BIGINT) AS bm25_fp4
FROM d CROSS JOIN g
WHERE {anyhit} > 0
"""


@register(
    "l4_bm25",
    oracle=_bm25_sql(),
    tags=("L4",),
)
def l4_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 relevance scoring (k1=1.2, b=0.75, Lucene idf) for a fixed
    term set — the ranking primitive for corpus search / retrieval-based
    dedup. Corpus statistics (N, avgdl, per-term df) are ONE agg broadcast
    back to the scoring scan; tf stays in JVM array functions. Contributions
    are summed in fixed term order so the float result is reproducible; the
    emitted score is int64 fixed-point (score × 10⁴, rounded) so the gate
    hashes integers — no double-formatting sensitivity in the oracle."""
    docs = T(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id", F.split(F.lower("text"), " ").alias("toks")
    ).withColumn("dl", F.size("toks"))

    def tf(term: str):
        return F.size(F.filter("toks", lambda t: t == F.lit(term)))

    g = d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
        *[
            F.sum(F.when(tf(t) > 0, 1).otherwise(0)).alias(f"df_{t}")
            for t in _BM25_TERMS
        ],
    )
    j = d.crossJoin(F.broadcast(g))

    def contrib(t: str):
        idf = F.log(
            F.lit(1)
            + (F.col("n_docs") - F.col(f"df_{t}") + F.lit(0.5))
            / (F.col(f"df_{t}") + F.lit(0.5))
        )
        return idf * (tf(t) * F.lit(2.2)) / (
            tf(t) + F.lit(1.2) * (F.lit(0.25) + F.lit(0.75) * F.col("dl") / F.col("avgdl"))
        )

    score = contrib(_BM25_TERMS[0])
    for t in _BM25_TERMS[1:]:
        score = score + contrib(t)
    anyhit = tf(_BM25_TERMS[0])
    for t in _BM25_TERMS[1:]:
        anyhit = anyhit + tf(t)
    return j.filter(anyhit > 0).select(
        "doc_id", F.round(score * F.lit(10000)).cast("long").alias("bm25_fp4")
    )


# -------------------------------------------------------- unigram log-lik


@register(
    "l4_unigram_loglik",
    oracle="""
WITH d AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok FROM documents),
v AS (SELECT tok, COUNT(*) AS c FROM d GROUP BY tok),
tot AS (SELECT SUM(c) AS total FROM v)
SELECT doc_id,
       CAST(ROUND(CAST(SUM(CAST(ln(CAST(c AS DOUBLE) / total) AS DECIMAL(25,12))) AS DOUBLE)
             / COUNT(*) * 1000000) AS BIGINT) AS avg_loglik_fp6
FROM d JOIN v USING (tok) CROSS JOIN tot
GROUP BY doc_id
""",
    tags=("L4",),
)
def l4_unigram_loglik(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model quality score: train token probabilities on
    the corpus itself (two-phase count agg), score each document by its mean
    token log-likelihood — the classic LM-based quality filter for training
    data (gibberish / boilerplate scores low). The vocab join broadcasts
    here (bounded vocab); at open-vocab scale it becomes a shuffle join on
    token, still linear. Decimal-exact sum of log-probs keeps the reduction
    order-independent; the emitted score is int64 fixed-point (× 10⁶) so the
    gate hashes integers, not formatted doubles."""
    docs = T(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("tok")
    )
    v = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    tot = v.agg(F.sum("c").alias("total"))
    return (
        toks.join(F.broadcast(v), "tok")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            F.log(F.col("c").cast("double") / F.col("total")).alias("ll"),
        )
        .groupBy("doc_id")
        .agg(
            F.round(
                F.sum(F.col("ll").cast("decimal(25,12)")).cast("double")
                / F.count(F.lit(1))
                * F.lit(1000000)
            )
            .cast("long")
            .alias("avg_loglik_fp6")
        )
    )


# ------------------------------------------------- SQL subquery surface
#
# Correlated subqueries are their own operator class: Catalyst decorrelates
# them (RewritePredicateSubquery / RewriteCorrelatedScalarSubquery) into the
# semi/anti/aggregate-join plans a user would otherwise hand-write. These
# run through the raw spark.sql front door over catalog views so the
# decorrelation path itself is what is being exercised; the identical SQL
# text is the oracle (both dialects agree on these shapes).


_EXISTS_SQL = """
SELECT o.o_orderpriority, COUNT(*) AS n_orders
FROM orders o
WHERE o.o_orderdate >= DATE '1995-01-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
GROUP BY o.o_orderpriority
"""


@register("x_exists_subquery", oracle=_EXISTS_SQL, tags=("J5",))
def x_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS predicate subquery (TPC-H Q4 shape): orders with at least one
    returned lineitem. Catalyst decorrelates to a left-semi hash join on the
    correlation key — no per-row re-execution; verify with .explain()."""
    from ..catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_EXISTS_SQL)


_NOT_EXISTS_SQL = """
SELECT c.c_nationkey, COUNT(*) AS n_customers,
       CAST(ROUND(SUM(CAST(c.c_acctbal AS DECIMAL(25,4))), 2) AS DOUBLE) AS total_bal
FROM customer c
WHERE c.c_acctbal > 0
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= DATE '1998-01-01')
GROUP BY c.c_nationkey
"""


@register("x_not_exists_subquery", oracle=_NOT_EXISTS_SQL, tags=("J6",))
def x_not_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS anti-subquery (TPC-H Q22 shape): positive-balance
    customers with no recent (1998+) order, per nation. Decorrelates to a left-anti
    join; at scale the anti side shuffles on the correlation key exactly
    like the hand-written j6 plan."""
    from ..catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_NOT_EXISTS_SQL)


_SCALAR_SUBQ_SQL = """
SELECT p.p_partkey, p.p_retailprice
FROM part p
WHERE p.p_retailprice > 1.05 * (
  SELECT CAST(SUM(CAST(p2.p_retailprice AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*)
  FROM part p2)
"""


@register("x_scalar_subquery", oracle=_SCALAR_SUBQ_SQL, tags=("A1",))
def x_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery: parts priced >5% above the global
    mean. Catalyst evaluates the subquery once (ReusedSubquery / scalar
    subquery broadcast), not per row — the mean is computed decimal-exact
    so both engines filter on the identical double."""
    from ..catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_SCALAR_SUBQ_SQL)


_CORR_SCALAR_SQL = """
SELECT l1.l_orderkey, l1.l_partkey, l1.l_linenumber, l1.l_quantity
FROM lineitem l1
WHERE l1.l_quantity < 0.5 * (
  SELECT CAST(SUM(CAST(l2.l_quantity AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*)
  FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)
"""


@register("x_correlated_scalar_subquery", oracle=_CORR_SCALAR_SQL, tags=("A1", "J1"))
def x_correlated_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar aggregate subquery (TPC-H Q17 shape): lineitems
    below half their part's mean quantity. Decorrelates to an aggregate on
    l_partkey joined back to the fact — ONE extra shuffle over the fact,
    not one subquery execution per row."""
    from ..catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_CORR_SCALAR_SQL)


_LATERAL_SQL = """
SELECT n.n_nationkey, t.c_custkey, t.c_acctbal
FROM nation n, LATERAL (
  SELECT c.c_custkey, c.c_acctbal FROM customer c
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY c.c_acctbal DESC, c.c_custkey LIMIT 2) t
"""


@register("x_lateral_topk", oracle=_LATERAL_SQL, tags=("W6", "J1"))
def x_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated table subquery with per-group ORDER BY + LIMIT —
    the SQL-standard spelling of top-k per group (w6's window rn<=k is the
    DataFrame spelling). Spark plans the correlated limit as a partitioned
    window/limit, not a per-outer-row loop."""
    from ..catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_LATERAL_SQL)


# ------------------------------------------- event analytics at scale


_FUNNEL_SQL = """
WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
s1 AS (SELECT user_id, MIN(ts) AS t_view FROM e WHERE event_type = 'view' GROUP BY user_id),
s2 AS (SELECT e.user_id, MIN(e.ts) AS t_click
       FROM e JOIN s1 ON e.user_id = s1.user_id
       WHERE e.event_type = 'click' AND e.ts > s1.t_view GROUP BY e.user_id),
s3 AS (SELECT e.user_id, MIN(e.ts) AS t_purchase
       FROM e JOIN s2 ON e.user_id = s2.user_id
       WHERE e.event_type = 'purchase' AND e.ts > s2.t_click GROUP BY e.user_id)
SELECT 'view' AS stage, (SELECT COUNT(*) FROM s1) AS n_users
UNION ALL SELECT 'view>click', (SELECT COUNT(*) FROM s2)
UNION ALL SELECT 'view>click>purchase', (SELECT COUNT(*) FROM s3)
"""


@register("x_funnel_analysis", oracle=_FUNNEL_SQL, tags=("A1", "J1", "W2"))
def x_funnel_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (view -> click -> purchase): each stage is
    the min event time STRICTLY AFTER the previous stage's time, per user.
    Three shuffles on user_id, all reusing the same hash partitioning; at
    100 TB the events scan is filtered per stage to one event_type before
    the shuffle (predicate pushdown), so each stage moves only its own
    type's rows."""
    e = T(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    s1 = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    s2 = (
        e.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    s3 = (
        e.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    rows = [
        s1.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit("view").alias("stage"), "n_users"
        ),
        s2.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit("view>click").alias("stage"), "n_users"
        ),
        s3.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit("view>click>purchase").alias("stage"), "n_users"
        ),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


_COHORT_SQL = """
WITH first_order AS (
  SELECT o_custkey, MIN(o_orderdate) AS d0 FROM orders GROUP BY o_custkey)
SELECT CAST(date_trunc('month', f.d0) AS DATE) AS cohort_month,
       (year(o.o_orderdate) - year(f.d0)) * 12
         + (month(o.o_orderdate) - month(f.d0)) AS months_since,
       COUNT(DISTINCT o.o_custkey) AS active_customers
FROM orders o JOIN first_order f ON o.o_custkey = f.o_custkey
GROUP BY 1, 2
"""


@register("x_cohort_retention", oracle=_COHORT_SQL, tags=("A1", "A2", "J1"))
def x_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: customers grouped by first-order month,
    activity counted by whole months since. The first-order table is a
    keyed agg reused via the same user-key partitioning as the join back;
    month arithmetic stays integer (identical across engines). The
    COUNT(DISTINCT) is per (cohort, offset) — bounded cardinality, safe
    two-phase expand."""
    o = T(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    f = o.groupBy("o_custkey").agg(F.min("o_orderdate").alias("d0"))
    j = o.join(f, "o_custkey")
    months_since = (F.year("o_orderdate") - F.year("d0")) * 12 + (
        F.month("o_orderdate") - F.month("d0")
    )
    return (
        j.select(
            F.date_trunc("month", "d0").cast("date").alias("cohort_month"),
            months_since.alias("months_since"),
            "o_custkey",
        )
        .groupBy("cohort_month", "months_since")
        .agg(F.count_distinct("o_custkey").alias("active_customers"))
    )


_GAPFILL_SQL = f"""
WITH bounds AS (SELECT CAST(MIN(o_orderdate) AS DATE) AS d_lo,
                CAST(MAX(o_orderdate) AS DATE) AS d_hi FROM orders),
spine AS (SELECT unnest(generate_series(d_lo, d_hi, INTERVAL 1 DAY))::DATE AS day FROM bounds),
daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS n_orders,
         {sql_dsum('o_totalprice')} AS revenue
  FROM orders GROUP BY CAST(o_orderdate AS DATE))
SELECT s.day, COALESCE(d.n_orders, 0) AS n_orders,
       COALESCE(d.revenue, CAST(0.0 AS DOUBLE)) AS revenue
FROM spine s LEFT JOIN daily d ON s.day = d.day
"""


@register("x_gapfill_timeseries", oracle=_GAPFILL_SQL, tags=("A1", "J3", "F2"))
def x_gapfill_timeseries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled daily revenue series: a generated date spine
    (sequence/explode — tiny, broadcast) left-joins the daily agg so silent
    zero-activity days appear explicitly — the prerequisite for any
    window/trend computation over time. The spine derives from a 2-value
    global agg, never a full-table sort."""
    from .helpers import dsum

    o = T(spark, sf_dir, "orders").select("o_orderdate", "o_totalprice")
    bounds = o.agg(
        F.min("o_orderdate").cast("date").alias("d_lo"),
        F.max("o_orderdate").cast("date").alias("d_hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence("d_lo", "d_hi")).alias("day")
    )
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice").alias("revenue")
    )
    return (
        F.broadcast(spine)
        .join(daily, "day", "left")
        .select(
            "day",
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.coalesce("revenue", F.lit(0.0)).alias("revenue"),
        )
    )


# --------------------------------------------- heavy hitters (Misra-Gries)


_HH_SQL = """
WITH t AS (SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents),
tot AS (SELECT COUNT(*) AS n_total FROM t)
SELECT tok, COUNT(*) AS n
FROM t CROSS JOIN tot
GROUP BY tok, n_total
HAVING COUNT(*) > n_total / 30.0
"""


@register("l4_heavy_hitters", oracle=_HH_SQL, tags=("L4", "A1"))
def l4_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters (tokens with count > n/30) via the Misra-Gries
    mergeable sketch: per-partition summaries of <= 29 counters (bounded
    memory at ANY token cardinality — a plain groupBy-count shuffles every
    distinct token), weighted-MG merge of the tiny summaries, then an exact
    recount of only the surviving candidates. Two linear passes,
    O(k * partitions) intermediate state; the final counts are exact (MG
    guarantees no item above threshold is dropped).
    Operator: operators/sketches.py."""
    from ..operators.sketches import mg_heavy_hitters

    docs = T(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.lower("text"), " ")).alias("tok")
    )
    return mg_heavy_hitters(toks, "tok", 30)


# ------------------------------------------------------------- PageRank


@register("x_pagerank_influence", oracle=None, tags=("J1", "A1"))
def x_pagerank_influence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the customer->supplier purchase graph (an edge per
    distinct (customer, supplier) pair traded through orders x lineitem):
    influence of suppliers in the trade network. Iterative DataFrame joins,
    one shuffle per round, lineage cut per iteration; dangling mass (all
    suppliers — the graph is bipartite) is redistributed via a scalar agg
    so total rank stays 1. Rows-only: iterative float ranks have no SQL
    equivalent; numpy power-iteration parity is pinned in
    tests/test_advanced.py. Operator: operators/graph.py::pagerank."""
    from ..operators.graph import pagerank

    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
        )
        .distinct()
    )
    pr = pagerank(edges, iters=6)
    return (
        pr.filter(F.col("node").startswith("s"))
        .select("node", F.round("pagerank", 8).alias("pagerank"))
        .orderBy(F.desc("pagerank"), "node")
        .limit(20)
    )


_LOCF_SQL = f"""
WITH bounds AS (SELECT CAST(MIN(o_orderdate) AS DATE) AS d_lo,
                CAST(MAX(o_orderdate) AS DATE) AS d_hi FROM orders),
spine AS (SELECT unnest(generate_series(d_lo, d_hi, INTERVAL 1 DAY))::DATE AS day FROM bounds),
pris AS (SELECT DISTINCT o_orderpriority AS pri FROM orders),
grid AS (SELECT pri, day FROM pris CROSS JOIN spine),
daily AS (
  SELECT o_orderpriority AS pri, CAST(o_orderdate AS DATE) AS day,
         {sql_dsum('o_totalprice')} AS revenue
  FROM orders GROUP BY 1, 2)
SELECT g.pri, g.day,
       last_value(d.revenue IGNORE NULLS)
         OVER (PARTITION BY g.pri ORDER BY g.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS revenue_locf,
       CAST(d.revenue IS NOT NULL AS INTEGER) AS observed
FROM grid g LEFT JOIN daily d ON g.pri = d.pri AND g.day = d.day
"""


@register("x_locf_forward_fill", oracle=_LOCF_SQL, tags=("W3", "J3", "F4"))
def x_locf_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-observation-carried-forward over a per-priority daily spine —
    the forward-fill primitive every time-series feature pipeline needs
    (sensor droputs, sparse prices, sparse state): `last(col,
    ignorenulls=True)` over a running frame carries the most recent
    non-null value through gap days. The spine is a broadcast
    dims×dates grid; one window pass per priority partition. Leading
    days before a priority's first observation stay NULL — pinned by the
    oracle's identical IGNORE NULLS window."""
    from pyspark.sql import Window

    from .helpers import dsum

    o = T(spark, sf_dir, "orders").select("o_orderpriority", "o_orderdate", "o_totalprice")
    bounds = o.agg(
        F.min("o_orderdate").cast("date").alias("d_lo"),
        F.max("o_orderdate").cast("date").alias("d_hi"),
    )
    spine = bounds.select(F.explode(F.sequence("d_lo", "d_hi")).alias("day"))
    pris = o.select(F.col("o_orderpriority").alias("pri")).distinct()
    grid = pris.crossJoin(F.broadcast(spine))
    daily = o.groupBy(
        F.col("o_orderpriority").alias("pri"),
        F.col("o_orderdate").cast("date").alias("day"),
    ).agg(dsum("o_totalprice").alias("revenue"))
    w = (
        Window.partitionBy("pri")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(daily, ["pri", "day"], "left")
        .select(
            "pri",
            "day",
            F.last("revenue", ignorenulls=True).over(w).alias("revenue_locf"),
            F.col("revenue").isNotNull().cast("int").alias("observed"),
        )
    )


@register(
    "x_pivot_matrix",
    oracle="""
SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
       CAST(ROUND(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(25,2)))
              FILTER (WHERE o_orderpriority = '1-URGENT'), 0), 2) AS DOUBLE) AS p_urgent,
       CAST(ROUND(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(25,2)))
              FILTER (WHERE o_orderpriority = '2-HIGH'), 0), 2) AS DOUBLE) AS p_high,
       CAST(ROUND(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(25,2)))
              FILTER (WHERE o_orderpriority = '3-MEDIUM'), 0), 2) AS DOUBLE) AS p_medium,
       CAST(ROUND(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(25,2)))
              FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED'), 0), 2) AS DOUBLE) AS p_notspec,
       CAST(ROUND(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(25,2)))
              FILTER (WHERE o_orderpriority = '5-LOW'), 0), 2) AS DOUBLE) AS p_low
FROM orders
GROUP BY 1
""",
    tags=("A6", "A1"),
)
def x_pivot_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long->wide PIVOT (the inverse of ``x_unpivot``): revenue matrix of
    order_year × order priority via ``groupBy().pivot(values=...)`` with
    the value list EXPLICIT — the scale-safe form: no extra distinct-scan
    job to discover pivot columns, and the pivot compiles to the same
    two-phase conditional aggregation a hand-written CASE matrix would
    (one shuffle on the group key, map-side partials). Decimal-exact sums
    cast back to double, empty cells coalesced to 0."""
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    names = ["p_urgent", "p_high", "p_medium", "p_notspec", "p_low"]
    wide = (
        T(spark, sf_dir, "orders")
        .groupBy(F.year("o_orderdate").cast("long").alias("order_year"))
        .pivot("o_orderpriority", prios)
        .agg(F.sum(F.col("o_totalprice").cast("decimal(25,2)")))
    )
    return wide.select(
        "order_year",
        *[
            F.coalesce(F.round(F.col(f"`{p}`"), 2).cast("double"), F.lit(0.0)).alias(n)
            for p, n in zip(prios, names)
        ],
    )


_H32 = (
    "list_sum([ (strpos('0123456789abcdef', substr(md5({sig}), i, 1)) - 1)"
    " * CAST(16 ** (8 - i) AS BIGINT) for i in range(1, 9)])"
)


@register(
    "x_table_checksum",
    oracle=f"""
WITH o AS (
  SELECT {_H32.format(sig="o_orderkey || '|' || CAST(CAST(CAST(o_totalprice AS DECIMAL(25,2)) * 100 AS BIGINT) AS VARCHAR) || '|' || CAST(CAST(o_orderdate AS DATE) AS VARCHAR)")} AS h
  FROM orders),
l AS (
  SELECT {_H32.format(sig="l_orderkey || '|' || CAST(l_linenumber AS VARCHAR) || '|' || CAST(CAST(CAST(l_extendedprice AS DECIMAL(25,2)) * 100 AS BIGINT) AS VARCHAR)")} AS h
  FROM lineitem)
SELECT 'orders' AS tbl, COUNT(*) AS n_rows,
       CAST(SUM(h) AS BIGINT) AS sum32, CAST(bit_xor(h) AS BIGINT) AS xor32
FROM o
UNION ALL
SELECT 'lineitem', COUNT(*), CAST(SUM(h) AS BIGINT), CAST(bit_xor(h) AS BIGINT)
FROM l
""",
    tags=("F1", "A1"),
)
def x_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent TABLE FINGERPRINT (anti-entropy / replica
    verification): every row serializes to a canonical string (keys,
    money as exact cents, dates as ISO), hashes to a 32-bit integer, and
    the table's identity is (count, SUM of hashes, XOR of hashes) —
    comparing two copies of a 100 TB table costs one aggregate on each
    side and moves three numbers, never data. Sum and xor are both
    commutative, so the fingerprint is partition-order- and
    layout-independent; at larger-than-2^31-row scale the sum would wrap
    mod 2^63 (still a valid fingerprint). One scan per table, two-phase
    aggregation, no shuffle beyond the final single-row combine."""
    def h32(sig):
        return F.conv(F.substring(F.md5(sig.cast("binary")), 1, 8), 16, 10).cast("long")

    o = T(spark, sf_dir, "orders").select(
        h32(
            F.concat_ws(
                "|",
                F.col("o_orderkey"),
                (F.col("o_totalprice").cast("decimal(25,2)") * 100).cast("long"),
                F.col("o_orderdate").cast("date").cast("string"),
            )
        ).alias("h")
    )
    li = T(spark, sf_dir, "lineitem").select(
        h32(
            F.concat_ws(
                "|",
                F.col("l_orderkey"),
                F.col("l_linenumber"),
                (F.col("l_extendedprice").cast("decimal(25,2)") * 100).cast("long"),
            )
        ).alias("h")
    )

    def fp(df, name):
        return df.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("h").cast("long").alias("sum32"),
            F.expr("bit_xor(h)").cast("long").alias("xor32"),
        ).select(F.lit(name).alias("tbl"), "n_rows", "sum32", "xor32")

    return fp(o, "orders").unionByName(fp(li, "lineitem"))


@register(
    "x_k_anonymity",
    oracle="""
WITH g AS (
  SELECT c_nationkey, c_mktsegment, COUNT(*) AS grp
  FROM customer GROUP BY 1, 2)
SELECT CAST(5 AS BIGINT) AS k,
       COUNT(*) AS n_groups,
       CAST(SUM(CASE WHEN grp < 5 THEN 1 ELSE 0 END) AS BIGINT) AS violating_groups,
       CAST(COALESCE(SUM(CASE WHEN grp < 5 THEN grp END), 0) AS BIGINT) AS rows_at_risk,
       CAST(MIN(grp) AS BIGINT) AS min_group
FROM g
""",
    tags=("A1", "A6"),
)
def x_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit (privacy governance, the release gate next to
    x_pseudonymize_join / x_vacuum_gdpr): group by the quasi-identifier
    tuple (nation, market segment), count equivalence classes smaller
    than k=5 and the rows they expose — the groups a release would have
    to generalize or suppress. One two-phase aggregate over the
    dimension; the audit output is constant-size regardless of table
    size."""
    g = (
        T(spark, sf_dir, "customer")
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("grp"))
    )
    return g.agg(
        F.lit(5).cast("long").alias("k"),
        F.count(F.lit(1)).alias("n_groups"),
        F.sum((F.col("grp") < 5).cast("long")).alias("violating_groups"),
        F.coalesce(F.sum(F.when(F.col("grp") < 5, F.col("grp"))), F.lit(0))
        .cast("long")
        .alias("rows_at_risk"),
        F.min("grp").cast("long").alias("min_group"),
    )


_SPATIAL_SQL = """
WITH c AS (
  SELECT c_custkey AS ck, c_nationkey AS nation,
         CAST(c_custkey % 1000 AS DOUBLE) / 10.0 AS lat,
         CAST((c_custkey * 7) % 1000 AS DOUBLE) / 10.0 AS lon
  FROM customer),
s AS (
  SELECT s_suppkey AS sk,
         CAST(s_suppkey % 1000 AS DOUBLE) / 10.0 AS lat,
         CAST((s_suppkey * 13) % 1000 AS DOUBLE) / 10.0 AS lon
  FROM supplier),
pairs AS (
  SELECT c.nation, c.ck, s.sk,
         (c.lat - s.lat) * (c.lat - s.lat)
         + (c.lon - s.lon) * (c.lon - s.lon) AS d2
  FROM c JOIN s
    ON (c.lat - s.lat) * (c.lat - s.lat)
       + (c.lon - s.lon) * (c.lon - s.lon) <= 6.25)
SELECT CAST(nation AS BIGINT) AS nation,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(COUNT(DISTINCT ck) AS BIGINT) AS n_customers_covered,
       CAST(SUM(CAST(FLOOR(100.0 * d2) AS BIGINT)) AS BIGINT) AS d2_mass_e2
FROM pairs GROUP BY 1
"""


@register("x_spatial_grid_join", oracle=_SPATIAL_SQL, tags=("J8", "P2"), doc="")
def x_spatial_grid_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPATIAL proximity join via GRID BINNING (the Sedona/GeoSpark
    partitioning pattern — 'which suppliers are within radius d of each
    customer', the 2-D generalization of x_binned_band_join's 1-D band
    trick): a raw distance theta-join is a cartesian
    BroadcastNestedLoopJoin — O(|C|x|S|) distance evaluations, dead at
    scale. Instead both point sets snap to a grid of cell size d; a
    circle of radius d around any point only reaches the 3x3
    neighborhood of its cell, so ONE side explodes to its 9 candidate
    cells and the join becomes an EQUI-join on cell id — the exact
    distance predicate then verifies only co-binned candidates.
    Correctness is containment: the 9-cell cover is a superset of the
    disk, so grid+verify ≡ the oracle's direct theta-join (which the
    oracle deliberately pays). Coordinates are deterministic 1-decimal
    synthetics; the squared-distance comparison runs on per-row
    IEEE-identical doubles (no sqrt — compare against d² = 6.25), and
    the reported distance mass floor-quantizes. At 100 TB this is the
    difference between |C|x|S| and |C|x9 candidate evaluations."""
    d_cell = 2.5
    c = T(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("ck"),
        F.col("c_nationkey").alias("nation"),
        ((F.col("c_custkey") % 1000).cast("double") / 10.0).alias("lat"),
        (((F.col("c_custkey") * 7) % 1000).cast("double") / 10.0).alias("lon"),
    )
    s = T(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("sk"),
        ((F.col("s_suppkey") % 1000).cast("double") / 10.0).alias("lat"),
        (((F.col("s_suppkey") * 13) % 1000).cast("double") / 10.0).alias("lon"),
    )
    cell = lambda col: F.floor(col / d_cell).cast("long")  # noqa: E731
    cb = c.select(
        "ck", "nation", "lat", "lon", cell(F.col("lat")).alias("cy"), cell(F.col("lon")).alias("cx")
    )
    off = spark.range(-1, 2).select(F.col("id").alias("dy")).crossJoin(
        spark.range(-1, 2).select(F.col("id").alias("dx"))
    )
    sb = (
        s.crossJoin(F.broadcast(off))
        .select(
            "sk",
            "lat",
            "lon",
            (cell(F.col("lat")) + F.col("dy")).alias("cy"),
            (cell(F.col("lon")) + F.col("dx")).alias("cx"),
        )
    )
    d2 = (
        (cb["lat"] - sb["lat"]) * (cb["lat"] - sb["lat"])
        + (cb["lon"] - sb["lon"]) * (cb["lon"] - sb["lon"])
    )
    pairs = cb.join(sb, ["cy", "cx"]).filter(d2 <= F.lit(d_cell * d_cell)).select(
        "nation", "ck", "sk", d2.alias("d2")
    )
    return pairs.groupBy(F.col("nation").cast("bigint").alias("nation")).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.countDistinct("ck").cast("bigint").alias("n_customers_covered"),
        F.sum(F.floor(F.lit(100.0) * F.col("d2")).cast("bigint"))
        .cast("bigint")
        .alias("d2_mass_e2"),
    )


_RCTE_SQL = """
WITH RECURSIVE edges AS (
  SELECT p_partkey AS child, p_partkey // 10 AS parent,
         p_partkey % 3 + 1 AS qty
  FROM part WHERE p_partkey >= 10),
bom AS (
  SELECT p_partkey AS node, p_partkey AS root,
         CAST(0 AS BIGINT) AS depth, CAST(1 AS BIGINT) AS qty
  FROM part WHERE p_partkey < 10
  UNION ALL
  SELECT e.child, b.root, b.depth + 1, b.qty * e.qty
  FROM edges e JOIN bom b ON b.node = e.parent)
SELECT root,
       CAST(MAX(depth) AS BIGINT) AS max_depth,
       CAST(COUNT(*) - 1 AS BIGINT) AS n_descendants,
       CAST(SUM(qty) AS BIGINT) AS total_extended_qty
FROM bom GROUP BY 1
"""


@register("x_recursive_cte", oracle=_RCTE_SQL, tags=("O2", "J1", "W3"), doc="")
def x_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RECURSIVE CTE — Spark 4's `WITH RECURSIVE` run ENGINE-SIDE (until
    now the repo used recursion only in DuckDB oracles; this query makes
    the iterative-closure surface itself part of the contract): a
    bill-of-materials hierarchy derived from the part table (parent =
    partkey ÷ 10, per-edge quantity = partkey mod 3 + 1, roots =
    single-digit keys) is exploded transitively from the roots,
    multiplying quantities along each path — the classic BOM extended-
    quantity rollup every MRP system runs. The recursion depth is
    log₁₀(max partkey) (≈6 at sf1), so Spark executes it as that many
    self-join iterations — each a distributed hash join on the frontier,
    never a driver loop; all quantities are small integers, the path
    products bounded by 3^depth, sums exact bigint. Engine and oracle
    run the SAME recursion shape (Spark spells integer division `DIV`,
    DuckDB `//` — identical on the positive keys here), so a hash match
    proves iterative plan equivalence, not just aggregate luck."""
    from ..catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH RECURSIVE edges AS (
          SELECT p_partkey AS child, p_partkey DIV 10 AS parent,
                 p_partkey % 3 + 1 AS qty
          FROM part WHERE p_partkey >= 10),
        bom AS (
          SELECT p_partkey AS node, p_partkey AS root,
                 CAST(0 AS BIGINT) AS depth, CAST(1 AS BIGINT) AS qty
          FROM part WHERE p_partkey < 10
          UNION ALL
          SELECT e.child, b.root, b.depth + 1, b.qty * e.qty
          FROM edges e JOIN bom b ON b.node = e.parent)
        SELECT root,
               CAST(MAX(depth) AS BIGINT) AS max_depth,
               CAST(COUNT(*) - 1 AS BIGINT) AS n_descendants,
               CAST(SUM(qty) AS BIGINT) AS total_extended_qty
        FROM bom GROUP BY root
        """
    )


_PIPE_SQL = """
SELECT l_returnflag AS flag, l_linestatus AS status,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,4)))
            AS DOUBLE) AS revenue,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
FROM lineitem
WHERE l_shipdate >= DATE '1994-01-01'
GROUP BY 1, 2
"""


@register("x_sql_pipe_syntax", oracle=_PIPE_SQL, tags=("A1", "P2", "F5"), doc="")
def x_sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL PIPE syntax (Spark 4's `|>` operators, from the SQL:202x
    pipe-syntax proposal Google published for BigQuery/ZetaSQL): the
    pricing-summary shape written as a linear dataflow —
    FROM |> WHERE |> EXTEND |> AGGREGATE … GROUP BY |> SELECT — instead
    of the inside-out nesting classic SQL forces. The point the hash
    match proves: pipe syntax is pure PARSER surface — it lowers to the
    identical Catalyst plan (pushed filter, two-phase aggregate) as the
    classic form the oracle runs, so adopting the readable syntax costs
    nothing at any scale. Revenue is the exact-decimal sum cast once;
    quantity sums as bigint — the usual determinism contract."""
    from ..catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        FROM lineitem
        |> WHERE l_shipdate >= DATE '1994-01-01'
        |> EXTEND CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,4)) AS net
        |> AGGREGATE CAST(COUNT(*) AS BIGINT) AS n_items,
                     CAST(SUM(net) AS DOUBLE) AS revenue,
                     CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
           GROUP BY l_returnflag, l_linestatus
        |> SELECT l_returnflag AS flag, l_linestatus AS status,
                  n_items, revenue, total_qty
        """
    )


_GROUP_BY_ALL_SQL = """
SELECT l_returnflag AS flag, l_linestatus AS status,
       CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS ship_year,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
FROM lineitem
GROUP BY 1, 2, 3
"""


@register("x_group_by_all", oracle=_GROUP_BY_ALL_SQL, tags=("A1", "F2"), doc="")
def x_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL (the 2023-vintage SQL-surface convenience both Spark
    3.4+ and DuckDB adopted): the engine groups by every non-aggregate
    SELECT expression IMPLICITLY — including the computed ship_year —
    while the oracle spells the classic GROUP BY 1, 2, 3, so the hash
    match proves the implicit resolution picks exactly the explicit
    grouping set (the failure mode being a computed column silently
    treated as an aggregate, or vice versa). Pure parser/analyzer
    surface: the Catalyst plan below is the identical two-phase hash
    aggregate, same cost at any scale."""
    from ..catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_returnflag AS flag, l_linestatus AS status,
               CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS ship_year,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
        FROM lineitem
        GROUP BY ALL
        """
    )


_DISTINCT_ON_SQL = """
SELECT DISTINCT ON (o_custkey)
       o_custkey AS custkey, o_orderdate AS latest_order_date,
       o_orderkey AS latest_orderkey,
       CAST(round(o_totalprice * 100, 0) AS BIGINT) AS latest_cents
FROM orders
ORDER BY o_custkey, o_orderdate DESC, o_orderkey DESC
"""


@register("x_distinct_on", oracle=_DISTINCT_ON_SQL, tags=("W1", "O4"), doc="")
def x_distinct_on(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT ON — the Postgres/DuckDB 'first row per key under an
    explicit order' idiom, and the declarative twin of the engine's
    row_number()=1 rewrite (the same plan x_first_value_dedup and
    o4_exact_dedup's keep-best variant compile to): latest order per
    customer with a FULLY deterministic tie-break (orderdate DESC, then
    orderkey DESC — DISTINCT ON without a total order is the classic
    nondeterminism trap, pinned here on both sides). Spark has no
    DISTINCT ON; the point of the pair is that the window rewrite IS
    the semantics. Plan: one shuffle on the key + WindowGroupLimit
    (rank pushdown keeps per-partition state at 1 row/key) — the
    scale-safe top-1-per-group shape, never a self-join on max."""
    o = T(spark, sf_dir, "orders")
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        o.select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderdate").alias("latest_order_date"),
            F.col("o_orderkey").alias("latest_orderkey"),
            F.round(F.col("o_totalprice") * 100, 0)
            .cast("bigint")
            .alias("latest_cents"),
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") == 1)
        .drop("rn")
    )


_NATURAL_JOIN_SQL = """
WITH c AS (SELECT c_custkey AS custkey, c_mktsegment AS segment FROM customer),
o AS (SELECT o_custkey AS custkey,
             CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
      FROM orders)
SELECT c.segment,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(COUNT(DISTINCT c.custkey) AS BIGINT) AS n_customers,
       CAST(SUM(o.cents) AS BIGINT) AS revenue_cents
FROM c JOIN o ON o.custkey = c.custkey
GROUP BY 1
"""


@register("x_natural_join", oracle=_NATURAL_JOIN_SQL, tags=("J1", "A1"), doc="")
def x_natural_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATURAL JOIN — the engine joins on ALL same-named columns
    implicitly (here exactly one, `custkey`, manufactured by aliasing
    projections, since TPC-H's prefixed names never collide naturally);
    the oracle runs the explicit equi-join, so the hash match proves
    the implicit key resolution found precisely the intended key — the
    classic NATURAL JOIN hazard being an accidental second shared
    column silently tightening the join. Parser surface over the same
    distributed hash join; the aggregate keeps revenue in exact integer
    cents."""
    from ..catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH c AS (SELECT c_custkey AS custkey, c_mktsegment AS segment
                   FROM customer),
        o AS (SELECT o_custkey AS custkey,
                     CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
              FROM orders)
        SELECT segment,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(COUNT(DISTINCT custkey) AS BIGINT) AS n_customers,
               CAST(SUM(cents) AS BIGINT) AS revenue_cents
        FROM c NATURAL JOIN o
        GROUP BY segment
        """
    )


_THEIL_SQL = """
WITH cust AS (
  SELECT o_orderpriority AS priority, o_custkey AS k,
         CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS r
  FROM orders GROUP BY 1, 2),
tot AS (
  SELECT priority, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(r) AS BIGINT) AS t
  FROM cust GROUP BY 1),
terms AS (
  SELECT c.priority, t.n, t.t,
         CAST(c.r * LN(CAST(c.r AS DOUBLE) * t.n / t.t) AS DECIMAL(25,4))
           AS term
  FROM cust c JOIN tot t ON t.priority = c.priority)
SELECT priority, MAX(n) AS n_customers,
       CAST(FLOOR(1000000.0 * CAST(SUM(term) AS DOUBLE) / MAX(t)) AS BIGINT)
         AS theil_e6
FROM terms GROUP BY 1
"""


@register("x_theil_index", oracle=_THEIL_SQL, tags=("A1", "F3"), doc="")
def x_theil_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THEIL T inequality index of customer revenue per priority — the
    entropy-based member of the concentration family (x_herfindahl_index
    squares shares, x_pareto_8020 cuts the cumulative curve, Gini ranks;
    Theil alone DECOMPOSES additively across subgroups, which is why
    census bureaus use it): T = (1/Θn)·Σ(x/μ)ln(x/μ) = Σ x·ln(x·n/T) / T.
    Float discipline: the per-customer term x·ln(ratio) is quantized to
    DECIMAL(25,4) BEFORE the sum — the house order-independent-reduction
    cure (NOTES r12), with the 1e-4 grain sitting ~3 orders above the
    worst-case ln ulp-error propagated through the product — then ONE
    closing division on identical doubles, floor-e6. Plan: fact pass →
    customer rollup → 5-row totals broadcast back → map-side terms +
    exact decimal reduce; no window, no sort."""
    o = T(spark, sf_dir, "orders")
    cust = o.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.col("o_custkey").alias("k"),
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
        .cast("bigint")
        .alias("r")
    )
    tot = cust.groupBy("priority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("r").cast("bigint").alias("t"),
    )
    terms = cust.join(F.broadcast(tot), on="priority").select(
        "priority",
        "n",
        "t",
        (
            F.col("r")
            * F.log(F.col("r").cast("double") * F.col("n") / F.col("t"))
        )
        .cast("decimal(25,4)")
        .alias("term"),
    )
    return terms.groupBy("priority").agg(
        F.max("n").alias("n_customers"),
        F.floor(
            F.lit(1000000.0) * F.sum("term").cast("double") / F.max("t")
        )
        .cast("bigint")
        .alias("theil_e6"),
    )


_CRAMERS_V_SQL = """
WITH cell AS (
  SELECT o_orderpriority AS p, o_orderstatus AS s,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM orders GROUP BY 1, 2),
rows_ AS (SELECT p, CAST(SUM(n) AS BIGINT) AS rn FROM cell GROUP BY 1),
cols_ AS (SELECT s, CAST(SUM(n) AS BIGINT) AS cn FROM cell GROUP BY 1),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn,
               CAST(COUNT(DISTINCT p) AS BIGINT) AS r,
               CAST(COUNT(DISTINCT s) AS BIGINT) AS c
        FROM cell),
chi AS (
  SELECT CAST(SUM(CAST(
           CAST(cell.n AS DOUBLE) * cell.n * tot.nn
           / (CAST(rows_.rn AS DOUBLE) * cols_.cn)
         AS DECIMAL(25,6))) AS DOUBLE) AS q,
         MAX(tot.nn) AS nn, MAX(tot.r) AS r, MAX(tot.c) AS c
  FROM cell
  JOIN rows_ ON rows_.p = cell.p
  JOIN cols_ ON cols_.s = cell.s
  CROSS JOIN tot)
SELECT nn AS n_orders, r AS n_priorities, c AS n_statuses,
       CAST(FLOOR(1000000.0 * (q - nn)) AS BIGINT) AS chi2_e6,
       CAST(FLOOR(1000000.0 * SQRT((q - nn)
              / (CAST(nn AS DOUBLE) * (LEAST(r, c) - 1)))) AS BIGINT) AS v_e6
FROM chi
"""


@register("x_cramers_v", oracle=_CRAMERS_V_SQL, tags=("A6", "F3"), doc="")
def x_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CRAMER'S V — the [0,1]-normalized effect size on top of the
    chi-square independence test (x_chi_square_independence answers 'is
    priority associated with status'; V answers 'how strongly', the
    number you can compare across tables of different size/shape):
    χ² = Σ n_ij²·N/(row_i·col_j) − N over the contingency cells (the
    algebraic form that never materializes expected counts), each cell
    term a double on exact integers quantized to DECIMAL(25,6) before
    the cross-cell sum (order-independent reduction — the cell count is
    tiny but the discipline is uniform), then V = √(χ²/(N·(min(r,c)−1)))
    — closed form, floor-e6. Plan: ONE fact pass → ~15-cell contingency
    rollup; marginals derive from the cells, never a second scan."""
    o = T(spark, sf_dir, "orders")
    cell = o.groupBy(
        F.col("o_orderpriority").alias("p"), F.col("o_orderstatus").alias("s")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    rows_ = cell.groupBy("p").agg(F.sum("n").cast("bigint").alias("rn"))
    cols_ = cell.groupBy("s").agg(F.sum("n").cast("bigint").alias("cn"))
    tot = cell.agg(
        F.sum("n").cast("bigint").alias("nn"),
        F.countDistinct("p").cast("bigint").alias("r"),
        F.countDistinct("s").cast("bigint").alias("c"),
    )
    chi = (
        cell.join(F.broadcast(rows_), on="p")
        .join(F.broadcast(cols_), on="s")
        .crossJoin(F.broadcast(tot))
        .agg(
            F.sum(
                (
                    F.col("n").cast("double")
                    * F.col("n")
                    * F.col("nn")
                    / (F.col("rn").cast("double") * F.col("cn"))
                ).cast("decimal(25,6)")
            )
            .cast("double")
            .alias("q"),
            F.max("nn").alias("nn"),
            F.max("r").alias("r"),
            F.max("c").alias("c"),
        )
    )
    chi2 = F.col("q") - F.col("nn")
    return chi.select(
        F.col("nn").alias("n_orders"),
        F.col("r").alias("n_priorities"),
        F.col("c").alias("n_statuses"),
        F.floor(F.lit(1000000.0) * chi2).cast("bigint").alias("chi2_e6"),
        F.floor(
            F.lit(1000000.0)
            * F.sqrt(
                chi2 / (F.col("nn").cast("double") * (F.least("r", "c") - 1))
            )
        )
        .cast("bigint")
        .alias("v_e6"),
    )


_ORDER_BY_ALL_SQL = """
SELECT o_orderstatus AS status, o_orderpriority AS priority,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders
GROUP BY 1, 2
ORDER BY status, priority, n_orders
LIMIT 7
"""


@register("x_order_by_all", oracle=_ORDER_BY_ALL_SQL, tags=("O1", "A1"), doc="")
def x_order_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY ALL (the DuckDB-pioneered shorthand Spark 3.4+ adopted:
    sort by every SELECT column, left to right) — made semantically
    VISIBLE by the LIMIT: the driver's hash is order-insensitive, so a
    bare sort would vanish from the contract, but top-7-under-the-sort
    changes the row SET, and the oracle spells the explicit ORDER BY
    status, priority, n_orders — the hash match proves the implicit
    expansion picks exactly the projection order (the failure mode
    being ALL resolving against the base table's columns instead of
    the select list). Compiles to TakeOrderedAndProject like any
    top-k."""
    from ..catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderstatus AS status, o_orderpriority AS priority,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders
        GROUP BY ALL
        ORDER BY ALL
        LIMIT 7
        """
    )


_SELECT_EXCEPT_SQL = """
SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority
FROM orders
WHERE o_orderkey % 1000 = 7
"""


@register("x_select_except", oracle=_SELECT_EXCEPT_SQL, tags=("P1", "F5"), doc="")
def x_select_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT * EXCEPT (...) — the wide-table ergonomics BigQuery
    standardized and Spark 4 adopted (DuckDB spells it EXCLUDE; the
    oracle enumerates the surviving columns explicitly): project
    everything BUT the named columns, the daily tool of 100-column
    lakehouse tables where enumerating the keepers is the error-prone
    path. The hash match proves the subtraction resolves against the
    post-* schema (order preserved, nothing else dropped). Column
    pruning still reaches the scan — EXCEPT is analyzer surface, the
    physical plan reads exactly the four surviving columns."""
    from ..catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT * EXCEPT (o_totalprice, o_orderdate)
        FROM orders
        WHERE o_orderkey % 1000 = 7
        """
    )


# ------------------------------------------------------ r14 SQL surface


_GROUPING_SETS_SQL = """
SELECT l_returnflag AS flag, l_linestatus AS status,
       CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT)
         AS grouping_lvl,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
"""


@register(
    "x_grouping_sets_explicit", oracle=_GROUPING_SETS_SQL, tags=("A4",), doc=""
)
def x_grouping_sets_explicit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUP BY GROUPING SETS with a CUSTOM lattice — the one
    rollup/cube (A4) can't spell: (flag, status), (status), () — i.e.
    the (flag)-only level is deliberately SKIPPED, which is exactly what
    a report wanting 'detail + per-status subtotal + grand total but no
    per-flag row' needs (ROLLUP would force the flag level in, CUBE
    would add a fourth). GROUPING() markers disambiguate real NULLs from
    subtotal NULLs, composed into one level id identically on both
    engines. Physically still a single scan: Spark expands the sets via
    Expand + one two-phase aggregate — 3× the rows of one grouping, not
    3 scans."""
    from ..catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_GROUPING_SETS_SQL)


_FILTER_CLAUSE_SQL = """
SELECT l_returnflag AS flag,
       CAST(COUNT(*) AS BIGINT) AS n_all,
       CAST(COUNT(*) FILTER (WHERE l_discount > 0.05) AS BIGINT) AS n_discounted,
       CAST(SUM(CAST(l_quantity AS BIGINT)) FILTER (WHERE l_quantity >= 30)
            AS BIGINT) AS qty_bulk,
       CAST(COUNT(DISTINCT l_suppkey) FILTER (WHERE l_returnflag = 'R')
            AS BIGINT) AS suppliers_returned
FROM lineitem
GROUP BY 1
"""

_FILTER_CLAUSE_ORACLE = """
SELECT l_returnflag AS flag,
       CAST(COUNT(*) AS BIGINT) AS n_all,
       CAST(COUNT(CASE WHEN l_discount > 0.05 THEN 1 END) AS BIGINT)
         AS n_discounted,
       CAST(SUM(CASE WHEN l_quantity >= 30 THEN CAST(l_quantity AS BIGINT) END)
            AS BIGINT) AS qty_bulk,
       CAST(COUNT(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_suppkey END)
            AS BIGINT) AS suppliers_returned
FROM lineitem
GROUP BY 1
"""


@register("x_filter_clause_agg", oracle=_FILTER_CLAUSE_ORACLE, tags=("A6",), doc="")
def x_filter_clause_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL:2003 FILTER (WHERE ...) aggregate modifier — the
    standard's spelling of conditional aggregation (a6's CASE-WHEN is
    the portable workaround; Spark 4 and DuckDB both take the real
    clause now). The engine runs FILTER syntax, the ORACLE runs the
    CASE rewrite — the hash match proves the clause lowers to exactly
    the conditional-aggregate semantics, including the subtle one:
    COUNT(DISTINCT x) FILTER (...) must dedupe only the rows passing
    the filter. One two-phase aggregate, filters evaluated map-side."""
    from ..catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_FILTER_CLAUSE_SQL)


_NAMED_WINDOW_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS c
  FROM orders GROUP BY 1)
SELECT day, c,
       CAST(SUM(c) OVER w AS BIGINT) AS running_total,
       CAST(LAG(c, 1) OVER w AS BIGINT) AS prev_day,
       CAST(ROW_NUMBER() OVER w AS BIGINT) AS day_idx
FROM daily
WINDOW w AS (ORDER BY day)
"""

_NAMED_WINDOW_ORACLE = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS c
  FROM orders GROUP BY 1)
SELECT day, c,
       CAST(SUM(c) OVER (ORDER BY day) AS BIGINT) AS running_total,
       CAST(LAG(c, 1) OVER (ORDER BY day) AS BIGINT) AS prev_day,
       CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS day_idx
FROM daily
"""


@register("x_named_window", oracle=_NAMED_WINDOW_ORACLE, tags=("W3", "W2"), doc="")
def x_named_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WINDOW clause (named window definitions, SQL:2003): three
    functions share ONE spec by name — the engine runs `OVER w ...
    WINDOW w AS (...)`, the oracle spells the identical spec inline
    three times; the hash match proves name resolution binds every
    function to the same spec (default cumulative frame; the day key is
    unique so RANGE ≡ ROWS — and LAG/ROW_NUMBER reject explicit frames
    anyway). Physically Spark fuses same-spec window
    functions into one WindowExec regardless of spelling — the clause
    is pure parser surface, zero plan cost. Frame input is the bounded
    daily grid (calendar-bounded at any SF, the x_drawdown whitelist
    argument)."""
    from ..catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_NAMED_WINDOW_SQL)


_VALUES_INLINE_SQL = """
WITH tier(tier_name, lo, hi) AS (
  VALUES ('small', 0, 25000), ('mid', 25000, 150000), ('large', 150000, 1000000))
SELECT tier_name,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM orders JOIN tier
  ON o_totalprice >= lo AND o_totalprice < hi
GROUP BY 1
"""


@register("x_values_inline", oracle=_VALUES_INLINE_SQL, tags=("J8", "J2"), doc="")
def x_values_inline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VALUES inline table constructor as a join dimension — the
    config-as-SQL pattern (pricing tiers, band edges, feature flags
    pasted straight into the query, no table round-trip). Both engines
    run the SAME text: a 3-row VALUES CTE theta-joined to facts. Spark
    plans the literal relation as a broadcast (3 rows — a
    BroadcastNestedLoopJoin over a one-pass fact scan, each row tests 3
    bands); the semantics and plan are identical to x_binned_band_join's
    explicit bin table, minus the table."""
    from ..catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_VALUES_INLINE_SQL)


_VARIANT_SQL = """
SELECT o_orderpriority AS priority,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
         AS cents_sum,
       CAST(MAX(LENGTH(o_orderstatus)) AS BIGINT) AS max_status_len
FROM orders
GROUP BY 1
"""


@register("x_variant_json", oracle=_VARIANT_SQL, tags=("F7", "F5"), doc="")
def x_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark 4 VARIANT type (the open semi-structured type Delta/
    Iceberg v3 standardize on): each order is JSON-ENCODED (to_json of
    a struct — the landing shape of an event-bus payload), PARSED to a
    VARIANT (`parse_json`), and the analysis runs on TYPED extractions
    (`variant_get` with a path and a target type) — never on strings.
    The oracle computes the identical aggregate from the original
    COLUMNS, so the hash match proves the encode → variant → typed-
    extract round trip is lossless, including the nested path and the
    int cast. Scale note: VARIANT's binary encoding makes repeated
    path access O(field) without re-parsing — the schema-on-read
    pattern for heterogeneous event payloads at ingest."""
    from ..catalog import register_views

    register_views(spark, sf_dir, tables=("orders",))
    return spark.sql(
        """
        WITH payload AS (
          SELECT parse_json(
                   to_json(named_struct(
                     'priority', o_orderpriority,
                     'order', named_struct(
                       'cents', CAST(round(o_totalprice * 100, 0) AS BIGINT),
                       'status', o_orderstatus)))) AS v
          FROM orders)
        SELECT variant_get(v, '$.priority', 'string') AS priority,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(variant_get(v, '$.order.cents', 'bigint')) AS BIGINT)
                 AS cents_sum,
               CAST(MAX(LENGTH(variant_get(v, '$.order.status', 'string')))
                 AS BIGINT) AS max_status_len
        FROM payload
        GROUP BY 1
        """
    )


_LATERAL_ALIAS_SQL = """
SELECT l_returnflag AS flag,
       CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS cents,
       cents - CAST(round(l_extendedprice * l_discount * 100, 0) AS BIGINT)
         AS net_cents,
       net_cents / 100 AS net_dollars_floor
FROM lineitem
WHERE l_orderkey % 500 = 7
"""


@register("x_lateral_alias", oracle=_LATERAL_ALIAS_SQL, tags=("P1", "F3"), doc="")
def x_lateral_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL COLUMN ALIASES (Spark 3.4+ / DuckDB 0.8+): a SELECT item
    referencing a SIBLING alias defined to its left — the spreadsheet-
    style derivation chain (cents → net_cents → net_dollars_floor)
    that classic SQL forces into nested subqueries. Both engines run
    the SAME text; the hash pins that resolution picks the LATERAL
    alias (not some same-named table column) and that the chain
    evaluates left-to-right. Analyzer surface only — Catalyst inlines
    the chain into one projection, same plan as the subquery spelling.
    Integer-division floor semantics pinned on bigint/100."""
    from ..catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_LATERAL_ALIAS_SQL)


_IDENTIFIER_SQL = """
SELECT n_name AS nation, CAST(COUNT(*) AS BIGINT) AS n_customers
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY 1
"""


@register("x_identifier_clause", oracle=_IDENTIFIER_SQL, tags=("S5", "J2"), doc="")
def x_identifier_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IDENTIFIER() clause (Spark 3.5+): SQL-injection-safe dynamic
    object names — the templated-pipeline primitive ('run this audit
    over ${table}') that string-splicing gets wrong the first time a
    name carries a quote. The engine resolves BOTH tables through
    IDENTIFIER() parameter markers bound to plain strings; the oracle
    names them directly — the hash proves the indirection changes
    nothing (same resolution, same broadcast-join plan). A malicious
    'name' ('customer; DROP…') fails to PARSE as an identifier instead
    of executing."""
    from ..catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT n_name AS nation, CAST(COUNT(*) AS BIGINT) AS n_customers
        FROM IDENTIFIER(:fact) JOIN IDENTIFIER(:dim)
          ON c_nationkey = n_nationkey
        GROUP BY 1
        """,
        args={"fact": "customer", "dim": "nation"},
    )


_SCRIPTING_SQL = """
WITH cutoff AS (
  SELECT AVG(CAST(o_totalprice AS DECIMAL(25,2))) AS c FROM orders)
SELECT o_orderpriority AS priority,
       CAST(COUNT(*) AS BIGINT) AS n_above_avg
FROM orders, cutoff
WHERE CAST(o_totalprice AS DECIMAL(25,2)) > cutoff.c
GROUP BY 1
"""


@register("x_sql_scripting", oracle=_SCRIPTING_SQL, tags=("F4", "A5"), doc="")
def x_sql_scripting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL SCRIPTING (BEGIN … END with DECLARE/SET session
    variables): the stored-procedure-shaped control flow warehouse
    migrations ask for first — compute a parameter in one statement,
    use it in the next, return the final SELECT. The script computes
    the average order value into a DECLAREd variable (EXACT decimal avg
    — a float avg would be reduce-order-dependent and could disagree
    across engines at the comparison boundary) and filters against it;
    the oracle is the equivalent single query with a scalar CTE. The
    variable is evaluated ONCE (one tiny job), then folded into the
    main query as a literal — the plan is a plain filtered aggregate,
    not a correlated subquery per row."""
    from ..catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        BEGIN
          DECLARE cutoff DECIMAL(25,2);
          SET cutoff = (SELECT AVG(CAST(o_totalprice AS DECIMAL(25,2)))
                        FROM orders);
          SELECT o_orderpriority AS priority,
                 CAST(COUNT(*) AS BIGINT) AS n_above_avg
          FROM orders
          WHERE CAST(o_totalprice AS DECIMAL(25,2)) > cutoff
          GROUP BY 1;
        END
        """
    )


_XML_SQL = """
SELECT o_orderstatus AS status,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
         AS cents_sum
FROM orders
GROUP BY 1
"""


@register("x_xml_roundtrip", oracle=_XML_SQL, tags=("S8", "F7"), doc="")
def x_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML ingestion surface (Spark 4 native XML, the spark-xml package
    folded into core): each order is SERIALIZED to an XML row
    (`to_xml` of a struct — the landing shape of B2B/EDI feeds), parsed
    back with a TYPED schema (`from_xml`), and the aggregate runs on
    the parsed fields. The oracle computes the identical aggregate from
    the original columns, so the hash proves serialize → parse is
    lossless including the bigint cast inside the XML text. Both
    functions are JVM-side; schema-on-read XML at ingest scale means
    the parse cost is one codegen'd pass, no UDF."""
    from ..catalog import register_views

    register_views(spark, sf_dir, tables=("orders",))
    return spark.sql(
        """
        WITH xml AS (
          SELECT to_xml(named_struct(
                   'status', o_orderstatus,
                   'cents', CAST(round(o_totalprice * 100, 0) AS BIGINT))) AS x
          FROM orders),
        parsed AS (
          SELECT from_xml(x, 'status STRING, cents BIGINT') AS s FROM xml)
        SELECT s.status AS status,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(s.cents) AS BIGINT) AS cents_sum
        FROM parsed
        GROUP BY 1
        """
    )


_VARIANT_EXPLODE_SQL = """
SELECT charge_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(cents) AS BIGINT) AS cents_sum
FROM (
  SELECT 'base' AS charge_type,
         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
  FROM orders
  UNION ALL
  SELECT 'priority_fee',
         CAST(round(o_totalprice, 0) AS BIGINT)
  FROM orders
  WHERE o_orderpriority IN ('1-URGENT', '2-HIGH'))
GROUP BY 1
"""


@register("x_variant_explode", oracle=_VARIANT_EXPLODE_SQL, tags=("F7", "F6"), doc="")
def x_variant_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT lateral explosion: each order lands as a JSON CHARGE
    ARRAY (every order a base charge; urgent/high orders an extra 1%
    priority fee), is parsed to one VARIANT, and `variant_explode`
    unnests the array positionally so typed extraction + aggregation
    run per charge — the event-bus pattern where one payload carries a
    variable-length detail list and the engine shreds it lazily. The
    oracle rebuilds the same charge rows relationally (UNION ALL from
    the original columns); the hash proves the encode → variant →
    explode → typed-extract pipeline loses nothing, including the
    conditional second element. Lateral explosion of a parsed column is
    a codegen'd generator — no UDF, no re-parse per element."""
    from ..catalog import register_views

    register_views(spark, sf_dir, tables=("orders",))
    return spark.sql(
        """
        WITH payload AS (
          SELECT parse_json(to_json(
                   CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                   THEN array(
                     named_struct('charge_type', 'base',
                       'cents', CAST(round(o_totalprice * 100, 0) AS BIGINT)),
                     named_struct('charge_type', 'priority_fee',
                       'cents', CAST(round(o_totalprice, 0) AS BIGINT)))
                   ELSE array(
                     named_struct('charge_type', 'base',
                       'cents', CAST(round(o_totalprice * 100, 0) AS BIGINT)))
                   END)) AS j
          FROM orders)
        SELECT variant_get(v.value, '$.charge_type', 'string') AS charge_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(variant_get(v.value, '$.cents', 'bigint')) AS BIGINT)
                 AS cents_sum
        FROM payload, LATERAL variant_explode(j) v
        GROUP BY 1
        """
    )
