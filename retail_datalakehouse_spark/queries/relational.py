"""Relational core queries: scans, projections, filters, joins, aggregates.

Covers SURVEY §2 rows S4, P1–P4, J1–J8, A1–A2, A4–A6, O1–O4 over the driver
testdata star schema. Each query is the Spark-idiomatic form (declarative
DataFrame plan → Catalyst picks pushdown/broadcast/AQE) with a DuckDB oracle.

Reference parity: the reference's gold-zone marts are *implied* by its star
schema + medallion zones (``/root/reference/s3_bucket.py:8-13``,
``datasets/*.csv`` — SURVEY §1.3); these queries are those marts re-expressed
over the TPC-H-ish testdata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import register
from .helpers import SQL_REVENUE, T, davg, dsum, revenue_expr, sql_davg, sql_dsum

# --------------------------------------------------------------------------
# Flagship (SURVEY §7 step 1): revenue / orders / distinct customers per
# region per month, top-10 by revenue. Exercises S4 scan → J1 fact⋈fact →
# J2 broadcast dims → F2 date_trunc → A1/A2 aggs → O1 deterministic top-k.
# --------------------------------------------------------------------------


@register(
    "flagship_region_month_revenue",
    oracle=f"""
SELECT r.r_name AS region,
       CAST(date_trunc('month', CAST(o.o_orderdate AS DATE)) AS DATE) AS order_month,
       {sql_dsum(SQL_REVENUE)} AS revenue,
       COUNT(DISTINCT o.o_orderkey) AS num_orders,
       COUNT(DISTINCT c.c_custkey) AS num_customers
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY 1, 2
ORDER BY revenue DESC, region, order_month
LIMIT 10
""",
    tags=("flagship", "J1", "J2", "A1", "A2", "O1"),
)
def flagship_region_month_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gold-mart spine: fact⋈fact shuffle join + broadcast dims + agg + top-k."""
    lineitem = T(spark, sf_dir, "lineitem")
    orders = T(spark, sf_dir, "orders")
    customer = T(spark, sf_dir, "customer")
    nation = T(spark, sf_dir, "nation")
    region = T(spark, sf_dir, "region")
    # r14 opt (guide §2.3 "aggregate before you shuffle"): revenue partials
    # reduce per order key BEFORE the fact⋈fact join — the join then moves
    # one row per order instead of one per lineitem, COUNT(DISTINCT
    # o_orderkey) collapses to a plain count (the pre-aggregated side is
    # unique on the key, region/month are order-level attributes), and the
    # final aggregate carries ONE distinct instead of two (Expand ×2 on
    # order-sized rows vs ×3 on lineitem-sized). Exactness unchanged: the
    # per-order decimal(25,4) partial sums re-sum exactly (decimal addition
    # is associative), and rounding still happens once at the end — the
    # oracle hash is bit-identical.
    li_per_order = (
        lineitem.select(
            "l_orderkey", revenue_expr().cast("decimal(25,4)").alias("__rev")
        )
        .groupBy("l_orderkey")
        .agg(F.sum("__rev").alias("__rev"))
    )
    return (
        li_per_order.join(orders, li_per_order.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(
            F.col("r_name").alias("region"),
            F.trunc(F.col("o_orderdate").cast("date"), "month").alias("order_month"),
        )
        .agg(
            F.round(F.sum("__rev"), 2).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("num_orders"),
            F.countDistinct("c_custkey").alias("num_customers"),
        )
        .orderBy(F.desc("revenue"), "region", "order_month")
        .limit(10)
    )


# ----------------------------------------------------------- P: projection /
# filter / predicates


@register(
    "p1_projection_computed",
    oracle="""
SELECT l_orderkey AS orderkey,
       l_linenumber AS linenumber,
       l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charged,
       CAST(l_quantity > 25 AS BOOLEAN) AS bulk
FROM lineitem
""",
    tags=("P1",),
)
def p1_projection_computed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Select subset + rename + derived columns (SURVEY §2.2 P1)."""
    return T(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("orderkey"),
        F.col("l_linenumber").alias("linenumber"),
        # Raw double, no rounding: per-row IEEE arithmetic is bit-identical
        # across engines; rounding doubles at half-way ties is NOT.
        (revenue_expr() * (F.lit(1.0) + F.col("l_tax"))).alias("charged"),
        (F.col("l_quantity") > 25).alias("bulk"),
    )


@register(
    "p2_filter_compound",
    oracle="""
SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice
FROM orders
WHERE o_totalprice > 300000.0 AND o_orderstatus = 'F'
  AND CAST(o_orderdate AS DATE) >= DATE '1997-01-01'
""",
    tags=("P2",),
)
def p2_filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Comparison + boolean-combo filter, pushed to the parquet scan (P2)."""
    o = T(spark, sf_dir, "orders")
    return o.filter(
        (F.col("o_totalprice") > 300000.0)
        & (F.col("o_orderstatus") == "F")
        & (F.col("o_orderdate").cast("date") >= F.lit("1997-01-01").cast("date"))
    ).select("o_orderkey", "o_custkey", F.col("o_totalprice").cast("double").alias("o_totalprice"))


@register(
    "p3_in_between_like_null",
    oracle="""
SELECT p_partkey, p_name, p_brand, p_size
FROM part
WHERE p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
  AND p_size BETWEEN 10 AND 40
  AND p_name LIKE '%a%'
  AND p_type IS NOT NULL
""",
    tags=("P3",),
)
def p3_in_between_like_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list + BETWEEN + LIKE + null predicate (P3)."""
    p = T(spark, sf_dir, "part")
    return p.filter(
        F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
        & F.col("p_size").between(10, 40)
        & F.col("p_name").like("%a%")
        & F.col("p_type").isNotNull()
    ).select("p_partkey", "p_name", "p_brand", "p_size")


@register(
    "p4_partition_pruned_scan",
    oracle="""
SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS o_date
FROM orders
WHERE CAST(o_orderdate AS DATE) >= DATE '1996-06-01'
  AND CAST(o_orderdate AS DATE) < DATE '1996-07-01'
""",
    tags=("P4",),
)
def p4_partition_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-month scan — the range filter Catalyst turns into partition
    pruning on a date-partitioned layout (reference `s3_bucket.py:50-58`)."""
    o = T(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.filter(
        (d >= F.lit("1996-06-01").cast("date")) & (d < F.lit("1996-07-01").cast("date"))
    ).select("o_orderkey", "o_custkey", d.alias("o_date"))


# ----------------------------------------------------------------- J: joins


@register(
    "j1_inner_join_facts",
    oracle=f"""
SELECT o.o_orderkey AS orderkey,
       COUNT(*) AS n_lines,
       {sql_dsum("l.l_quantity", scale=2)} AS total_qty,
       CAST(MAX(o.o_totalprice) AS DOUBLE) AS totalprice
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY 1
""",
    tags=("J1", "A1"),
)
def j1_inner_join_facts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⋈fact inner equi-join (shuffle/SMJ at scale), per-order rollup."""
    l = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(F.col("o_orderkey").alias("orderkey"))
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dsum("l_quantity", scale=2).alias("total_qty"),
            F.max("o_totalprice").cast("double").alias("totalprice"),
        )
    )


@register(
    "j2_broadcast_dim_join",
    oracle=f"""
SELECT p.p_brand AS brand,
       COUNT(*) AS n_lines,
       {sql_dsum(SQL_REVENUE)} AS revenue
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY 1
""",
    tags=("J2", "A1"),
)
def j2_broadcast_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⋈small-dim with an explicit broadcast hint (no shuffle of the
    fact side) — the items⋈products(134 rows) pattern from the reference."""
    l = T(spark, sf_dir, "lineitem")
    p = T(spark, sf_dir, "part")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(F.count(F.lit(1)).alias("n_lines"), dsum(revenue_expr()).alias("revenue"))
    )


@register(
    "j3_left_outer_join",
    oracle="""
SELECT p.p_partkey AS partkey,
       COUNT(l.l_orderkey) AS n_lines,
       CAST(COUNT(*) FILTER (WHERE l.l_orderkey IS NULL) AS BIGINT) AS orphan
FROM part p
LEFT JOIN lineitem l ON p.p_partkey = l.l_partkey
GROUP BY 1
""",
    tags=("J3",),
)
def j3_left_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join keeping unmatched dimension rows — models the
    reference's broken-FK tolerance (116/133 product_ids missing, SURVEY
    §1.3: gold marts must not silently drop lines)."""
    p = T(spark, sf_dir, "part")
    l = T(spark, sf_dir, "lineitem")
    return (
        p.join(l, p.p_partkey == l.l_partkey, "left")
        .groupBy(F.col("p_partkey").alias("partkey"))
        .agg(
            F.count("l_orderkey").alias("n_lines"),
            F.sum(F.when(F.col("l_orderkey").isNull(), 1).otherwise(0)).alias("orphan"),
        )
    )


@register(
    "j4_full_outer_join",
    oracle="""
SELECT COALESCE(c.c_nationkey, s.s_nationkey) AS nationkey,
       COUNT(DISTINCT c.c_custkey) AS n_cust,
       COUNT(DISTINCT s.s_suppkey) AS n_supp
FROM customer c
FULL OUTER JOIN supplier s ON c.c_nationkey = s.s_nationkey
GROUP BY 1
""",
    tags=("J4",),
)
def j4_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join: nation-completeness view across two dimensions."""
    c = T(spark, sf_dir, "customer")
    s = T(spark, sf_dir, "supplier")
    return (
        c.join(s, c.c_nationkey == s.s_nationkey, "full")
        .groupBy(F.coalesce(c.c_nationkey, s.s_nationkey).alias("nationkey"))
        .agg(
            F.countDistinct("c_custkey").alias("n_cust"),
            F.countDistinct("s_suppkey").alias("n_supp"),
        )
    )


@register(
    "j5_left_semi_join",
    oracle="""
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 2000.0)
""",
    tags=("J5",),
)
def j5_left_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join: customers with ≥1 qualifying order (EXISTS)."""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 2000.0)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "j6_left_anti_join",
    oracle="""
SELECT p_partkey, p_name
FROM part p
WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_partkey = p.p_partkey AND l.l_quantity >= 45)
""",
    tags=("J6",),
)
def j6_left_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join: parts never ordered in near-full quantity (NOT
    EXISTS) — the orphan / corrected-row detection building block for MERGE
    (SURVEY §2.1 S7)."""
    p = T(spark, sf_dir, "part")
    l = T(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 45)
    return p.join(l, p.p_partkey == l.l_partkey, "left_anti").select("p_partkey", "p_name")


@register(
    "j7_cross_join",
    oracle="""
SELECT r.r_name AS region, n.n_name AS nation
FROM region r CROSS JOIN nation n
""",
    tags=("J7",),
)
def j7_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join over two small dims (scaffolding for densification)."""
    r = T(spark, sf_dir, "region")
    n = T(spark, sf_dir, "nation")
    return r.crossJoin(n).select(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))


@register(
    "j8_range_join",
    oracle="""
SELECT p.p_partkey AS partkey,
       COUNT(*) AS n_lines_in_band
FROM lineitem l
JOIN part p
  ON l.l_partkey = p.p_partkey
 AND l.l_quantity BETWEEN p.p_size - 5 AND p.p_size + 5
GROUP BY 1
""",
    tags=("J8",),
)
def j8_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi + range (theta) join: quantity within a size band. The equi key
    keeps the join hash-partitionable; the range term is a post-filter on the
    matched pairs, so this stays shuffle-efficient at 100 TB."""
    l = T(spark, sf_dir, "lineitem")
    p = T(spark, sf_dir, "part")
    cond = (l.l_partkey == p.p_partkey) & l.l_quantity.between(p.p_size - 5, p.p_size + 5)
    return (
        l.join(p, cond)
        .groupBy(F.col("p_partkey").alias("partkey"))
        .agg(F.count(F.lit(1)).alias("n_lines_in_band"))
    )


# ------------------------------------------------------------ A: aggregates


@register(
    "a1_pricing_summary",
    oracle=f"""
SELECT l_returnflag AS returnflag,
       l_linestatus AS linestatus,
       {sql_dsum("l_quantity", scale=2)} AS sum_qty,
       {sql_dsum("l_extendedprice", scale=2)} AS sum_base_price,
       {sql_dsum(SQL_REVENUE)} AS sum_disc_price,
       {sql_davg("l_quantity")} AS avg_qty,
       {sql_davg("l_discount")} AS avg_disc,
       COUNT(*) AS count_order,
       CAST(MIN(l_quantity) AS DOUBLE) AS min_qty,
       CAST(MAX(l_quantity) AS DOUBLE) AS max_qty
FROM lineitem
WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-01'
GROUP BY 1, 2
""",
    tags=("A1", "A7"),
)
def a1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: hash group-by with the full core agg
    set; Spark runs it as partial+final HashAggregate (A7) automatically."""
    l = T(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").cast("date") <= F.lit("1998-09-01").cast("date")
    )
    return l.groupBy(
        F.col("l_returnflag").alias("returnflag"), F.col("l_linestatus").alias("linestatus")
    ).agg(
        dsum("l_quantity", scale=2).alias("sum_qty"),
        dsum("l_extendedprice", scale=2).alias("sum_base_price"),
        dsum(revenue_expr()).alias("sum_disc_price"),
        davg("l_quantity").alias("avg_qty"),
        davg("l_discount").alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
        F.min("l_quantity").cast("double").alias("min_qty"),
        F.max("l_quantity").cast("double").alias("max_qty"),
    )


@register(
    "a2_count_distinct",
    oracle="""
SELECT CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE) AS order_month,
       COUNT(DISTINCT o_custkey) AS distinct_customers,
       COUNT(*) AS n_orders
FROM orders
GROUP BY 1
""",
    tags=("A2",),
)
def a2_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact COUNT(DISTINCT) per month (expand+two-phase agg in Spark)."""
    o = T(spark, sf_dir, "orders")
    return o.groupBy(F.trunc(F.col("o_orderdate").cast("date"), "month").alias("order_month")).agg(
        F.countDistinct("o_custkey").alias("distinct_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "a4_rollup",
    oracle=f"""
SELECT COALESCE(r.r_name, 'ALL') AS region,
       COALESCE(n.n_name, 'ALL') AS nation,
       {sql_dsum("o.o_totalprice", scale=2)} AS revenue
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP (r.r_name, n.n_name)
""",
    tags=("A4",),
)
def a4_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup hierarchy region→nation→grand-total (gold-mart convention).
    NULL group labels coalesced to 'ALL' on both engines for hash parity."""
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    n = T(spark, sf_dir, "nation")
    r = T(spark, sf_dir, "region")
    joined = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(dsum("o_totalprice", scale=2).alias("revenue"))
        .select(
            F.coalesce(F.col("r_name"), F.lit("ALL")).alias("region"),
            F.coalesce(F.col("n_name"), F.lit("ALL")).alias("nation"),
            "revenue",
        )
    )


@register(
    "a5_having",
    oracle=f"""
SELECT o_custkey AS custkey,
       COUNT(*) AS n_orders,
       {sql_dsum("o_totalprice", scale=2)} AS spend
FROM orders
GROUP BY 1
HAVING COUNT(*) > 1
""",
    tags=("A5",),
)
def a5_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation filter — repeat customers (the reference data has
    101 such users, SURVEY §1.3)."""
    o = T(spark, sf_dir, "orders")
    return (
        o.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice", scale=2).alias("spend"))
        .filter(F.col("n_orders") > 1)
    )


@register(
    "a6_conditional_agg",
    oracle=f"""
SELECT l_linestatus AS linestatus,
       {sql_davg("CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END")} AS return_rate,
       {sql_dsum("CASE WHEN l_quantity > 25 THEN " + SQL_REVENUE + " ELSE 0.0 END")} AS bulk_revenue
FROM lineitem
GROUP BY 1
""",
    tags=("A6",),
)
def a6_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation — the `avg(reordered)` / `sum(when(...))`
    reorder-rate pattern from the retail star (`reordered` ∈ {0,1})."""
    l = T(spark, sf_dir, "lineitem")
    return l.groupBy(F.col("l_linestatus").alias("linestatus")).agg(
        davg(F.when(F.col("l_returnflag") == "R", 1.0).otherwise(0.0)).alias("return_rate"),
        dsum(F.when(F.col("l_quantity") > 25, revenue_expr()).otherwise(0.0)).alias("bulk_revenue"),
    )


# ------------------------------------------------- O: sort / limit / set ops


@register(
    "o1_topk_orders",
    oracle="""
SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 25
""",
    tags=("O1",),
)
def o1_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k with deterministic tie-break (TakeOrderedAndProject —
    no full sort: each partition keeps k, driver merges)."""
    o = T(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(25)
        .select("o_orderkey", "o_custkey", F.col("o_totalprice").cast("double").alias("o_totalprice"))
    )


@register(
    "o2_union_all",
    oracle="""
SELECT u.event_type AS event_type, COUNT(*) AS n
FROM (
  SELECT event_type FROM events WHERE user_id % 2 = 0
  UNION ALL
  SELECT event_type FROM events WHERE user_id % 2 = 1
) u
GROUP BY 1
""",
    tags=("O2",),
)
def o2_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL consolidation — the multi-day file stacking pattern
    (`s3_bucket.py:50-58` daily drops → one logical table)."""
    e = T(spark, sf_dir, "events")
    even = e.filter(F.col("user_id") % 2 == 0).select("event_type")
    odd = e.filter(F.col("user_id") % 2 == 1).select("event_type")
    return even.unionByName(odd).groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))


@register(
    "o3_set_ops",
    oracle="""
WITH d1 AS (SELECT DISTINCT user_id FROM events
            WHERE CAST(ts AS DATE) < DATE '2024-01-11'),
     d2 AS (SELECT DISTINCT user_id FROM events
            WHERE CAST(ts AS DATE) >= DATE '2024-01-11')
SELECT 'both' AS cohort, COUNT(*) AS n FROM (SELECT user_id FROM d1 INTERSECT SELECT user_id FROM d2) x
UNION ALL
SELECT 'churned' AS cohort, COUNT(*) AS n FROM (SELECT user_id FROM d1 EXCEPT SELECT user_id FROM d2) y
UNION ALL
SELECT 'new' AS cohort, COUNT(*) AS n FROM (SELECT user_id FROM d2 EXCEPT SELECT user_id FROM d1) z
""",
    tags=("O3",),
)
def o3_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT user-cohort analysis across two time slices —
    the day-over-day churn sets implied by the daily partitions."""
    e = T(spark, sf_dir, "events")
    cut = F.lit("2024-01-11").cast("date")
    d1 = e.filter(F.col("ts").cast("date") < cut).select("user_id").distinct()
    d2 = e.filter(F.col("ts").cast("date") >= cut).select("user_id").distinct()
    both = d1.intersect(d2).agg(F.count(F.lit(1)).alias("n")).select(F.lit("both").alias("cohort"), "n")
    churned = d1.exceptAll(d2).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("churned").alias("cohort"), "n"
    )
    new = d2.exceptAll(d1).agg(F.count(F.lit(1)).alias("n")).select(F.lit("new").alias("cohort"), "n")
    return both.unionByName(churned).unionByName(new)


@register(
    "o4_exact_dedup",
    oracle="""
SELECT event_id, user_id, event_type
FROM (
  SELECT event_id, user_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY event_id) AS rn
  FROM events
) t
WHERE rn = 1
""",
    tags=("O4",),
)
def o4_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic exact dedup: keep the first row per key by an explicit
    order (row_number=1), not `dropDuplicates` whose survivor is partition-
    order-dependent — re-ingest idempotency (`s3_bucket.py:33-37` theme)."""
    from ..operators.dedup import dedup_keep_first

    e = T(spark, sf_dir, "events")
    return dedup_keep_first(e, keys=["user_id", "event_type"], order_by=["event_id"]).select(
        "event_id", "user_id", "event_type"
    )


@register(
    "a4_cube",
    oracle=f"""
SELECT COALESCE(o_orderstatus, 'ALL') AS status,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       COUNT(*) AS n_orders,
       {sql_dsum("o_totalprice", scale=2)} AS revenue
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
    tags=("A4",),
)
def a4_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over status × priority: all 4 grouping combinations in one
    pass (Spark expands then two-phase aggregates — no repeated scans)."""
    o = T(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice", scale=2).alias("revenue"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "revenue",
        )
    )


@register(
    "a4_grouping_sets",
    oracle=f"""
SELECT COALESCE(o_orderstatus, 'ALL') AS status,
       COALESCE(CAST(year(o_orderdate) AS VARCHAR), 'ALL') AS yr,
       {sql_dsum("o_totalprice", scale=2)} AS revenue
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (year(o_orderdate)))
""",
    tags=("A4",),
)
def a4_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (status-only + year-only rollups in one
    aggregation) via Spark SQL."""
    T(spark, sf_dir, "orders").createOrReplaceTempView("__orders_gs")
    return spark.sql(
        """
        SELECT COALESCE(o_orderstatus, 'ALL') AS status,
               COALESCE(CAST(year(o_orderdate) AS STRING), 'ALL') AS yr,
               CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(25,2))), 2) AS DOUBLE) AS revenue
        FROM __orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (year(o_orderdate)))
        """
    )


_NULL_SAFE_SQL = """
WITH c AS (
  SELECT NULLIF(c_nationkey, 0) AS k,
         COUNT(*) AS n_cust,
         CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(25,2))), 2) AS DOUBLE) AS cust_bal
  FROM customer GROUP BY 1),
s AS (
  SELECT NULLIF(s_nationkey, 0) AS k,
         COUNT(*) AS n_supp,
         CAST(ROUND(SUM(CAST(s_acctbal AS DECIMAL(25,2))), 2) AS DOUBLE) AS supp_bal
  FROM supplier GROUP BY 1)
SELECT CAST(c.k AS BIGINT) AS nation_bucket,
       CAST(c.n_cust AS BIGINT) AS n_cust,
       CAST(s.n_supp AS BIGINT) AS n_supp,
       c.cust_bal, s.supp_bal
FROM c JOIN s ON c.k IS NOT DISTINCT FROM s.k
"""


@register("x_null_safe_join", oracle=_NULL_SAFE_SQL, tags=("J1", "F4"), doc="")
def x_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (`<=>` / SQL `IS NOT DISTINCT FROM`): the
    join every sentinel-laden warehouse needs — NULL keys MATCH each
    other instead of silently dropping, so the "unknown nation" bucket
    on the customer side lands on the "unknown nation" bucket on the
    supplier side (a plain `=` join would lose both). Here nation 0 is
    nulled out via NULLIF on both sides, each side pre-aggregates to
    one row per bucket (partial-agg pass over the base table), and the
    null-safe join stitches the two small aggregates. Catalyst treats
    EqualNullSafe as a HASHABLE equi-join key — this plans as a hash
    join on `coalesce`-style key normalization, NOT a nested-loop theta
    join, so it scales like any other equi-join at 100 TB. Cf. the
    reference's dirty-FK data traits (SURVEY §1.3): null-safe joins are
    how those rows stay accountable."""
    c = (
        T(spark, sf_dir, "customer")
        .groupBy(F.nullif(F.col("c_nationkey"), F.lit(0)).alias("k"))
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            dsum("c_acctbal", scale=2).alias("cust_bal"),
        )
    )
    s = (
        T(spark, sf_dir, "supplier")
        .groupBy(F.nullif(F.col("s_nationkey"), F.lit(0)).alias("k"))
        .agg(
            F.count(F.lit(1)).alias("n_supp"),
            dsum("s_acctbal", scale=2).alias("supp_bal"),
        )
    )
    return c.join(s, c["k"].eqNullSafe(s["k"])).select(
        c["k"].cast("bigint").alias("nation_bucket"),
        "n_cust",
        "n_supp",
        "cust_bal",
        "supp_bal",
    )


_KEYSET_SQL = """
SELECT o_orderkey, o_orderdate, o_totalprice
FROM orders
WHERE (CAST(o_orderdate AS DATE) > DATE '1996-03-15')
   OR (CAST(o_orderdate AS DATE) = DATE '1996-03-15' AND o_orderkey > 1234)
ORDER BY CAST(o_orderdate AS DATE), o_orderkey
LIMIT 25
"""


@register("x_keyset_pagination", oracle=_KEYSET_SQL, tags=("O1", "P2"), doc="")
def x_keyset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KEYSET (seek-method) pagination — the scale-correct replacement
    for OFFSET: `OFFSET 1e9 LIMIT 25` must SORT AND DISCARD a billion
    rows on every page, while the keyset form turns the cursor
    (last_date, last_key) into a sargable ROW-VALUE predicate
    `(date, key) > (:d, :k)` that reaches the parquet scan as a pushed
    filter, and the LIMIT compiles to TakeOrderedAndProject (a
    bounded heap per partition + one tiny merge — plan-audited). Page
    cost is O(page + scan-of-pruned-files) and CONSTANT in page depth;
    the total (date, key) order makes pages stable and gap-free across
    concurrent appends upstream of the cursor. This is how every
    export/scroll API over a 100 TB table has to paginate."""
    o = T(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    cursor_d, cursor_k = F.lit("1996-03-15").cast("date"), F.lit(1234)
    page = (
        o.filter((d > cursor_d) | ((d == cursor_d) & (F.col("o_orderkey") > cursor_k)))
        .orderBy(d, "o_orderkey")
        .limit(25)
    )
    return page.select("o_orderkey", "o_orderdate", "o_totalprice")
