"""Window-function queries (SURVEY §2.5 W1–W6) and the as-of join (J9).

The reference's ``days_since_prior_order`` column is a *materialized lag*
(SURVEY §1.3) — W2 recomputes exactly that pattern. Top-k-per-group (W6)
uses rank + filter, which Spark 3.5+ rewrites to ``WindowGroupLimit``
(per-partition heap, no full sort) — the plan that survives 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.joins import asof_join
from ..operators.ranking import (
    attach_global_rank,
    ntile_from_rank,
    percent_rank_from_rank,
)
from .base import register
from .helpers import T, dsum, revenue_expr, sql_dsum


@register(
    "w1_ranking",
    oracle="""
SELECT brand, partkey, part_revenue, rnk, drnk, rn
FROM (
  SELECT p.p_brand AS brand,
         p.p_partkey AS partkey,
         CAST(ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(25,4))), 2) AS DOUBLE) AS part_revenue,
         RANK() OVER (PARTITION BY p.p_brand ORDER BY SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(25,4))) DESC, p.p_partkey) AS rnk,
         DENSE_RANK() OVER (PARTITION BY p.p_brand ORDER BY SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(25,4))) DESC, p.p_partkey) AS drnk,
         ROW_NUMBER() OVER (PARTITION BY p.p_brand ORDER BY SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(25,4))) DESC, p.p_partkey) AS rn
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY p.p_brand, p.p_partkey
) t
WHERE rn <= 5
""",
    tags=("W1", "W6"),
)
def w1_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank/row_number per brand; top-5 parts per brand (W6).
    Ranked on the exact decimal revenue (pre-cast) with partkey tie-break
    so both engines order identically."""
    l = T(spark, sf_dir, "lineitem")
    p = T(spark, sf_dir, "part")
    per_part = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"), F.col("p_partkey").alias("partkey"))
        .agg(F.sum((revenue_expr()).cast("decimal(25,4)")).alias("rev_exact"))
    )
    w = Window.partitionBy("brand").orderBy(F.desc("rev_exact"), F.asc("partkey"))
    return (
        per_part.withColumn("rnk", F.rank().over(w).cast("long"))
        .withColumn("drnk", F.dense_rank().over(w).cast("long"))
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 5)
        .select(
            "brand",
            "partkey",
            F.round(F.col("rev_exact"), 2).cast("double").alias("part_revenue"),
            "rnk",
            "drnk",
            "rn",
        )
    )


@register(
    "w2_lag_lead",
    oracle="""
SELECT custkey, orderkey, o_date,
       date_diff('day', prev_date, o_date) AS days_since_prior_order,
       next_price
FROM (
  SELECT o_custkey AS custkey,
         o_orderkey AS orderkey,
         CAST(o_orderdate AS DATE) AS o_date,
         LAG(CAST(o_orderdate AS DATE)) OVER (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE), o_orderkey) AS prev_date,
         LEAD(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE), o_orderkey) AS next_price
  FROM orders
) t
""",
    tags=("W2",),
)
def w2_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead per customer — recomputes the reference's materialized
    `days_since_prior_order` column from raw order history (SURVEY §2.5 W2,
    evidence: order_items col 4 IS this lag)."""
    o = T(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    w = Window.partitionBy("o_custkey").orderBy(d.asc(), F.col("o_orderkey").asc())
    return o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("orderkey"),
        d.alias("o_date"),
        F.datediff(d, F.lag(d).over(w)).cast("long").alias("days_since_prior_order"),
        F.lead("o_totalprice").over(w).alias("next_price"),
    )


@register(
    "w3_running_total",
    oracle="""
SELECT o_custkey AS custkey,
       o_orderkey AS orderkey,
       CAST(o_orderdate AS DATE) AS o_date,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(25,2))) OVER (
         PARTITION BY o_custkey
         ORDER BY CAST(o_orderdate AS DATE), o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum_spend
FROM orders
""",
    tags=("W3",),
)
def w3_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative spend per customer (rowsBetween frame). Running sum in
    exact decimal so every prefix matches the oracle bit-for-bit."""
    o = T(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(d.asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("orderkey"),
        d.alias("o_date"),
        F.sum(F.col("o_totalprice").cast("decimal(25,2)")).over(w).cast("double").alias("cum_spend"),
    )


@register(
    "w4_moving_aggregate",
    oracle=f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         {sql_dsum("o_totalprice", scale=2)} AS day_revenue
  FROM orders GROUP BY 1
)
SELECT d, day_revenue,
       CAST(SUM(CAST(day_revenue AS DECIMAL(25,2))) OVER (
         ORDER BY date_diff('day', DATE '1970-01-01', d)
         RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE) AS rev_7d
FROM daily
""",
    tags=("W4",),
)
def w4_moving_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day moving revenue via a rangeBetween frame over epoch-day
    ordinals — the time-based frame works on days with gaps (unlike a
    rows frame), matching the daily-partition cadence of the reference."""
    o = T(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    daily = o.groupBy(d.alias("d")).agg(dsum("o_totalprice", scale=2).alias("day_revenue"))
    w = (
        Window.orderBy(F.datediff(F.col("d"), F.lit("1970-01-01").cast("date")))
        .rangeBetween(-6, Window.currentRow)
    )
    return daily.select(
        "d",
        "day_revenue",
        F.sum(F.col("day_revenue").cast("decimal(25,2)")).over(w).cast("double").alias("rev_7d"),
    )


@register(
    "w5_ntile_percent_rank",
    oracle=f"""
WITH spend AS (
  SELECT o_custkey AS custkey, {sql_dsum("o_totalprice", scale=2)} AS total_spend
  FROM orders GROUP BY 1
)
SELECT custkey, total_spend,
       NTILE(4) OVER (ORDER BY total_spend DESC, custkey) AS quartile,
       ROUND(PERCENT_RANK() OVER (ORDER BY total_spend DESC, custkey), 6) AS pct_rank
FROM spend
""",
    tags=("W5",),
)
def w5_ntile_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer spend quartiles: ntile(4) + percent_rank with a total
    order (spend desc, custkey) so bucket boundaries are deterministic.

    The SEMANTICS are the inventory's global-order window; the PLAN is
    the two-pass distributed rank (range-repartition -> per-partition
    row_number -> broadcast offsets), because this frame scales with
    customers — an unpartitioned WindowExec would single-task-sort
    10^8-10^9 rows at 100 TB. ntile/percent_rank are then arithmetic on
    (rank, total); explain_audit pins zero unpartitioned windows here.
    """
    o = T(spark, sf_dir, "orders")
    spend = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        dsum("o_totalprice", scale=2).alias("total_spend")
    )
    ranked = attach_global_rank(
        spend,
        [("total_spend", "desc"), "custkey"],
        rank_col="_r",
        total_col="_c",
    )
    return ranked.select(
        "custkey",
        "total_spend",
        ntile_from_rank("_r", "_c", 4).cast("long").alias("quartile"),
        F.round(percent_rank_from_rank("_r", "_c"), 6).alias("pct_rank"),
    )


@register(
    "j9_asof_join",
    oracle="""
SELECT e.event_id AS event_id,
       e.user_id AS user_id,
       CAST(e.ts AS TIMESTAMP) AS ts,
       CAST(s.ts AS TIMESTAMP) AS ts_asof,
       s.event_id AS event_id_asof
FROM (SELECT * FROM events WHERE event_type = 'purchase') e
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
  ON e.user_id = s.user_id AND CAST(e.ts AS TIMESTAMP) >= CAST(s.ts AS TIMESTAMP)
""",
    tags=("J9",),
)
def j9_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase event matched to the user's latest
    signup event at-or-before it — the correction-file versioning pattern
    ("which version was current at t") generalized. Checked against
    DuckDB's native ASOF JOIN. Single shuffle per side on the key
    (union + running window), no range explosion."""
    e = T(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    signups = e.filter(F.col("event_type") == "signup").select("event_id", "user_id", "ts")
    out = asof_join(
        purchases,
        signups,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_cols=["event_id"],
    )
    return out.select("event_id", "user_id", "ts", "ts_asof", "event_id_asof")


@register(
    "w7_first_last_nth",
    oracle="""
WITH w AS (
  SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS d, o_totalprice,
         FIRST_VALUE(o_orderkey) OVER win AS first_order,
         LAST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey
                                      ORDER BY CAST(o_orderdate AS DATE), o_orderkey
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                               AND UNBOUNDED FOLLOWING) AS last_order,
         NTH_VALUE(o_orderkey, 2) OVER (PARTITION BY o_custkey
                                        ORDER BY CAST(o_orderdate AS DATE), o_orderkey
                                        ROWS BETWEEN UNBOUNDED PRECEDING
                                                 AND UNBOUNDED FOLLOWING) AS second_order
  FROM orders
  WINDOW win AS (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE), o_orderkey)
)
SELECT o_custkey, first_order, last_order, second_order, COUNT(*) AS n_orders
FROM w
GROUP BY 1, 2, 3, 4
HAVING COUNT(*) >= 3
""",
    tags=("W2", "W1"),
)
def w7_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value — positional window
    navigation (first, latest, and second order per customer). The frame
    matters and is pinned explicitly: last/nth need UNBOUNDED FOLLOWING
    (the default frame stops at CURRENT ROW and silently returns the
    running last — a classic window bug both engines share identically).
    (o_orderdate, o_orderkey) is a total order, so values are
    deterministic."""
    o = T(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    base = Window.partitionBy("o_custkey").orderBy(d, "o_orderkey")
    running = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    full = base.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    w = o.select(
        "o_custkey",
        F.first("o_orderkey").over(running).alias("first_order"),
        F.last("o_orderkey").over(full).alias("last_order"),
        F.nth_value("o_orderkey", 2).over(full).alias("second_order"),
    )
    return (
        w.groupBy("o_custkey", "first_order", "last_order", "second_order")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= 3)
    )


_RANGE_IV_SQL = """
WITH daily AS (
  SELECT o_orderpriority AS priority, CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(25,2))) AS DOUBLE) AS rev
  FROM orders GROUP BY 1, 2),
framed AS (
  SELECT priority, day,
         CAST(SUM(CAST(rev AS DECIMAL(25,2))) OVER (
           PARTITION BY priority ORDER BY day
           RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW) AS DOUBLE)
           AS trailing7_range,
         CAST(SUM(CAST(rev AS DECIMAL(25,2))) OVER (
           PARTITION BY priority ORDER BY day
           ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
           AS trailing7_rows,
         CAST(COUNT(*) OVER (
           PARTITION BY priority ORDER BY day
           RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW) AS BIGINT)
           AS n_in_frame
  FROM daily)
SELECT priority,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(ROUND(SUM(CAST(trailing7_range AS DECIMAL(25,2))), 2) AS DOUBLE)
         AS range_mass,
       CAST(COUNT(*) FILTER (WHERE trailing7_range <> trailing7_rows) AS BIGINT)
         AS n_gap_affected,
       CAST(MIN(n_in_frame) AS BIGINT) AS min_frame_rows
FROM framed GROUP BY 1
"""


@register("x_range_interval_frame", oracle=_RANGE_IV_SQL, tags=("W4", "F2"), doc="")
def x_range_interval_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frames with TIME intervals (`RANGE BETWEEN INTERVAL 6 DAY
    PRECEDING` — value-based frames over event time, vs w4's
    numeric-offset rangeBetween): on a series WITH GAPS the distinction
    is semantic, not syntactic — a ROWS frame counts 7 physical rows
    regardless of how many calendar days they span, while the RANGE
    frame admits exactly the trailing calendar week; n_gap_affected
    counts the days where the two disagree, i.e. where a naive rolling
    average would silently be wrong. Both frames run on the daily
    aggregate grid (facts touched once), and every windowed sum is an
    exact DECIMAL sum, so frame content — not float order — is the
    only thing being compared. The DataFrame API's rangeBetween takes
    numeric offsets only; interval frames are SQL-surface, exercised
    here through spark.sql over a registered view — the engine's SQL
    and DataFrame lanes compose freely over the same temp catalog."""
    o = T(spark, sf_dir, "orders")
    o.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderdate").cast("date").alias("day"),
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(25,2)")).cast("double").alias("rev")
    ).createOrReplaceTempView("daily_rev_v")
    return spark.sql("""
        WITH framed AS (
          SELECT priority, day,
                 CAST(SUM(CAST(rev AS DECIMAL(25,2))) OVER (
                   PARTITION BY priority ORDER BY day
                   RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT ROW) AS DOUBLE)
                   AS trailing7_range,
                 CAST(SUM(CAST(rev AS DECIMAL(25,2))) OVER (
                   PARTITION BY priority ORDER BY day
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
                   AS trailing7_rows,
                 COUNT(*) OVER (
                   PARTITION BY priority ORDER BY day
                   RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT ROW)
                   AS n_in_frame
          FROM daily_rev_v)
        SELECT priority,
               COUNT(*) AS n_days,
               CAST(ROUND(SUM(CAST(trailing7_range AS DECIMAL(25,2))), 2) AS DOUBLE)
                 AS range_mass,
               CAST(SUM(CASE WHEN trailing7_range <> trailing7_rows THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_gap_affected,
               CAST(MIN(n_in_frame) AS BIGINT) AS min_frame_rows
        FROM framed GROUP BY priority
    """)


_LAG_IGNORE_NULLS_SQL = """
WITH e AS (
  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id,
         CASE WHEN event_type = 'purchase'
              THEN CAST(round(value * 100, 0) AS BIGINT) END AS pcents
  FROM events),
l AS (
  SELECT user_id, event_type, event_id,
         LAG(pcents IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_purchase
  FROM e)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(prev_purchase) AS BIGINT) AS n_with_prior_purchase,
       CAST(SUM(prev_purchase) AS BIGINT) AS prior_purchase_mass_cents
FROM l GROUP BY 1
"""


@register("x_lag_ignore_nulls", oracle=_LAG_IGNORE_NULLS_SQL, tags=("W2", "F4"), doc="")
def x_lag_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG ... IGNORE NULLS — 'the most recent PURCHASE amount as of
    each event', the null-skipping navigation the SQL standard added
    precisely because plain LAG(1) answers the wrong question on sparse
    series (it returns the previous ROW, usually a NULL non-purchase;
    x_locf_forward_fill's LAST_VALUE IGNORE NULLS carries a value
    forward INCLUDING the current row — LAG excludes it, the strict
    'known before now' semantics feature stores need, cf. x_pit_features
    doing the same with an explicit frame). Engine and oracle spell it
    differently (Spark: `LAG(x) IGNORE NULLS`; DuckDB: `LAG(x IGNORE
    NULLS)`) — the hash match pins the shared null-skipping semantics
    under the same total order (ts, event_id). Purchase values cross
    as exact integer cents. ONE shuffle on user_id, linear per
    partition — the standard navigation-window scale shape."""
    e = T(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.col("ts").cast("timestamp").alias("ts"),
        "event_id",
        F.when(
            F.col("event_type") == "purchase",
            F.round(F.col("value") * 100, 0).cast("bigint"),
        ).alias("pcents"),
    )
    e.createOrReplaceTempView("rdl_lag_in_v")
    lagged = spark.sql(
        """
        SELECT user_id, event_type, event_id,
               LAG(pcents) IGNORE NULLS
                 OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 AS prev_purchase
        FROM rdl_lag_in_v
        """
    )
    return lagged.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.count("prev_purchase").cast("bigint").alias("n_with_prior_purchase"),
        F.sum("prev_purchase").cast("bigint").alias("prior_purchase_mass_cents"),
    )
