"""Beyond-inventory queries: data-quality auditing, pivot, extended window/
string/date functions, sampling, and incremental gold refresh.

These extend SURVEY §2 where a real lakehouse user would expect more:
the reference's defining data traits are *dirty* (broken FK, NULLs,
header drift — SURVEY §1.3), so the engine ships a first-class DQ audit;
and its daily-drop cadence implies incremental (not full-recompute) gold
refresh, verified here against the full recompute.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .base import register
from .helpers import T, dsum, sql_dsum


@register(
    "x_dq_audit",
    oracle="""
SELECT 'orders_null_custkey' AS check_name,
       CAST(COUNT(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT) AS n_bad,
       COUNT(*) AS n_total
FROM orders
UNION ALL
SELECT 'lineitem_orphan_orderkey' AS check_name,
       CAST(COUNT(*) FILTER (WHERE o.o_orderkey IS NULL) AS BIGINT) AS n_bad,
       COUNT(*) AS n_total
FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
UNION ALL
SELECT 'lineitem_orphan_partkey' AS check_name,
       CAST(COUNT(*) FILTER (WHERE p.p_partkey IS NULL) AS BIGINT) AS n_bad,
       COUNT(*) AS n_total
FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
UNION ALL
SELECT 'orders_negative_price' AS check_name,
       CAST(COUNT(*) FILTER (WHERE o_totalprice <= 0) AS BIGINT) AS n_bad,
       COUNT(*) AS n_total
FROM orders
""",
    tags=("DQ", "J3", "A6"),
)
def x_dq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality audit mart: null keys, FK orphans (the reference's
    116/133 broken product FK generalized), domain violations — one scan
    + left joins, conditional aggs. The check a medallion bronze→silver
    promotion gates on."""
    o = T(spark, sf_dir, "orders")
    l = T(spark, sf_dir, "lineitem")
    p = T(spark, sf_dir, "part")

    def check(name: str, df: DataFrame, bad) -> DataFrame:
        return df.agg(
            F.sum(F.when(bad, 1).otherwise(0)).cast("long").alias("n_bad"),
            F.count(F.lit(1)).alias("n_total"),
        ).select(F.lit(name).alias("check_name"), "n_bad", "n_total")

    lo = l.join(o, l.l_orderkey == o.o_orderkey, "left")
    lp = l.join(p, l.l_partkey == p.p_partkey, "left")
    return (
        check("orders_null_custkey", o, F.col("o_custkey").isNull())
        .unionByName(check("lineitem_orphan_orderkey", lo, F.col("o_orderkey").isNull()))
        .unionByName(check("lineitem_orphan_partkey", lp, F.col("p_partkey").isNull()))
        .unionByName(check("orders_negative_price", o, F.col("o_totalprice") <= 0))
    )


@register(
    "x_pivot",
    oracle=f"""
SELECT CAST(year(o_orderdate) AS INT) AS yr,
       {sql_dsum("CASE WHEN o_orderstatus = 'F' THEN o_totalprice END", scale=2)} AS F,
       {sql_dsum("CASE WHEN o_orderstatus = 'O' THEN o_totalprice END", scale=2)} AS O,
       {sql_dsum("CASE WHEN o_orderstatus = 'P' THEN o_totalprice END", scale=2)} AS P
FROM orders
GROUP BY 1
""",
    tags=("A1", "P1"),
)
def x_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: status columns × year rows (explicit value list so the plan
    is a single pass — no second job to discover pivot values)."""
    o = T(spark, sf_dir, "orders")
    return (
        o.groupBy(F.year("o_orderdate").alias("yr"))
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(dsum("o_totalprice", scale=2))
    )


@register(
    "x_window_navigation",
    oracle="""
SELECT o_custkey AS custkey, o_orderkey AS orderkey,
       FIRST_VALUE(o_totalprice) OVER w AS first_price,
       LAST_VALUE(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE), o_orderkey
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_price,
       NTH_VALUE(o_totalprice, 2) OVER w AS second_price,
       ROUND(CUME_DIST() OVER (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey), 6) AS cd
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE), o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
""",
    tags=("W1", "W5"),
)
def x_window_navigation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Navigation window functions: first/last/nth value + cume_dist with
    explicit frames (the default frame differs between engines — always
    pin it)."""
    o = T(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    w = Window.partitionBy("o_custkey").orderBy(d.asc(), F.col("o_orderkey").asc())
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    w_rank = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    return o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("orderkey"),
        F.first("o_totalprice").over(w_run).alias("first_price"),
        F.last("o_totalprice").over(w_all).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(w_run).alias("second_price"),
        F.round(F.cume_dist().over(w_rank), 6).alias("cd"),
    )


@register(
    "x_string_extended",
    oracle="""
SELECT p_partkey,
       upper(substring(p_name, 1, 1)) || substring(p_name, 2) AS name_title,
       lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS key_padded,
       levenshtein(p_brand, 'Brand#1') AS brand_dist,
       reverse(p_brand) AS brand_rev,
       split_part(p_type, ' ', 1) AS type_head,
       repeat('*', p_size % 5) AS stars
FROM part
""",
    tags=("F1",),
)
def x_string_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended string family: capitalize/lpad/levenshtein/reverse/
    split_part/repeat. (DuckDB 1.0 has no initcap — first-letter
    capitalization is spelled out identically on both engines.)"""
    p = T(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.concat(
            F.upper(F.substring("p_name", 1, 1)), F.expr("substring(p_name, 2)")
        ).alias("name_title"),
        F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias("key_padded"),
        F.levenshtein("p_brand", F.lit("Brand#1")).cast("long").alias("brand_dist"),
        F.reverse("p_brand").alias("brand_rev"),
        F.split_part("p_type", F.lit(" "), F.lit(1)).alias("type_head"),
        F.repeat(F.lit("*"), (F.col("p_size") % 5).cast("int")).alias("stars"),
    )


@register(
    "x_date_extended",
    oracle="""
SELECT o_orderkey,
       last_day(CAST(o_orderdate AS DATE)) AS month_end,
       CAST(quarter(o_orderdate) AS INT) AS qtr,
       CAST(weekofyear(CAST(o_orderdate AS DATE)) AS INT) AS wk,
       CAST(date_trunc('week', CAST(o_orderdate AS DATE)) AS DATE) AS week_start,
       ROUND(CAST(datediff('month', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS DOUBLE), 1) AS months_since
FROM orders
""",
    tags=("F2",),
)
def x_date_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended date family: last_day/quarter/weekofyear/week-trunc/
    month-diff. (DuckDB datediff('month') counts boundary crossings;
    Spark months_between is fractional — floor both to whole months.)"""
    o = T(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    months = F.floor(F.months_between(F.date_trunc("month", d), F.lit("1995-01-01").cast("date")))
    return o.select(
        "o_orderkey",
        F.last_day(d).alias("month_end"),
        F.quarter(d).alias("qtr"),
        F.weekofyear(d).alias("wk"),
        F.trunc(d, "week").alias("week_start"),
        F.round(months.cast("double"), 1).alias("months_since"),
    )


@register(
    "x_sample_deterministic",
    oracle="""
SELECT l_returnflag,
       COUNT(*) AS n_sampled
FROM lineitem
WHERE ((l_orderkey * 8 + l_linenumber) % 1000003) * 2654435761 % 4294967296
      < 429496730
GROUP BY 1
""",
    tags=("P2",),
)
def x_sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% Bernoulli sample via KEY HASHING (Knuth
    multiplicative hash on the row key), not engine RNG — upgraded from
    rows-only to a golden-value oracle (VERDICT r13 item 5, r12 item 5).

    Why hash-based beats seeded `df.sample` for replay-stable
    training-data subsetting: Spark seeds its sampler per PARTITION, so
    the "same seed" selects a different row set whenever partitioning
    changes (different session parallelism, file splits, or cluster
    size) — silently irreproducible across environments. Keyed hashing
    makes membership a pure function of the ROW, identical on any
    engine, any partitioning, any scale — so DuckDB can run the literal
    same arithmetic and hash-match. Integer ranges stay within int64:
    the key folds mod 1000003 (prime) before the 2654435761 mix, and
    the threshold is floor(0.1 * 2^32) + 1. Map-only (filter + two-phase
    count), no shuffle of unsampled rows."""
    l = T(spark, sf_dir, "lineitem")
    key = F.col("l_orderkey") * F.lit(8) + F.col("l_linenumber")
    h = (key % F.lit(1000003)) * F.lit(2654435761) % F.lit(4294967296)
    return (
        l.filter(h < F.lit(429496730))
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
    )


@register(
    "x_incremental_gold_refresh",
    oracle=f"""
SELECT CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE) AS order_month,
       COUNT(*) AS n_orders,
       {sql_dsum("o_totalprice", scale=2)} AS revenue
FROM orders
GROUP BY 1
""",
    tags=("S3", "A1", "S7"),
)
def x_incremental_gold_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental gold refresh: the mart is built from a historical slice,
    then the 'newly arrived' tail partition is aggregated ALONE and merged
    in (partial-agg merge on the month key) — never a full recompute. The
    oracle IS the full recompute: hash match proves incremental ≡ full,
    the invariant that makes daily refresh safe at 100 TB."""
    from ..operators.merge import merge_upsert

    o = T(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    cutoff = F.lit("2000-01-01").cast("date")
    month = F.trunc(d, "month").alias("order_month")

    def mart(df: DataFrame) -> DataFrame:
        return df.groupBy(month).agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(25,2)")).alias("rev_exact"),
        )

    historical = mart(o.filter(d < cutoff))
    arriving = mart(o.filter(d >= cutoff))
    # months split cleanly at the cutoff (first-of-month), so merge = upsert
    merged = merge_upsert(historical, arriving, keys=["order_month"], broadcast_updates=False)
    return merged.select(
        "order_month",
        "n_orders",
        F.round(F.col("rev_exact"), 2).cast("double").alias("revenue"),
    )


@register(
    "x_cdc_merge",
    oracle="""
WITH changes AS (
  SELECT o_orderkey, 'delete' AS op FROM orders WHERE o_orderkey % 103 = 0
  UNION ALL
  SELECT o_orderkey, 'upsert' AS op FROM orders WHERE o_orderkey % 97 = 0 AND o_orderkey % 103 != 0
),
survivors AS (
  SELECT t.* FROM orders t
  WHERE NOT EXISTS (SELECT 1 FROM changes c WHERE c.o_orderkey = t.o_orderkey)
),
upserts AS (
  SELECT o.o_orderkey, o.o_custkey, o.o_orderstatus,
         o.o_totalprice + 5.0 AS o_totalprice, o.o_orderdate, o.o_orderpriority
  FROM orders o JOIN changes c ON o.o_orderkey = c.o_orderkey AND c.op = 'upsert'
),
merged AS (SELECT * FROM survivors UNION ALL SELECT * FROM upserts)
SELECT o_orderstatus AS status,
       COUNT(*) AS n_orders,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(25,2))), 2) AS DOUBLE) AS revenue
FROM merged
GROUP BY 1
""",
    tags=("S7",),
)
def x_cdc_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full CDC fold: one change batch carrying deletes (%103 keys) AND
    upserts (%97 keys, price+5) applied via merge_cdc (last-writer-wins,
    tombstone removal) — the stream-of-corrections generalization of the
    reference's update file."""
    from ..operators.merge import merge_cdc

    o = T(spark, sf_dir, "orders")
    deletes = o.filter(F.col("o_orderkey") % 103 == 0).withColumn("op", F.lit("delete"))
    upserts = (
        o.filter((F.col("o_orderkey") % 97 == 0) & (F.col("o_orderkey") % 103 != 0))
        .withColumn("o_totalprice", F.col("o_totalprice") + 5.0)
        .withColumn("op", F.lit("upsert"))
    )
    changes = deletes.unionByName(upserts).withColumn("seq", F.lit(1))
    merged = merge_cdc(o, changes, keys=["o_orderkey"], order_by=["seq"])
    return merged.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice", scale=2).alias("revenue")
    )


@register(
    "x_schema_evolution",
    # The evolution report is DETERMINISTIC given the staged batch
    # schemas, so the oracle is the expected catalog report itself
    # (golden-values SQL) — upgraded from rows-only in r12: a hash
    # match pins the exact UPDATE/DEPRECATE split, not just row count.
    oracle="""
SELECT * FROM (VALUES
  ('n_name',      'string', 'deprecated'),
  ('n_nationkey', 'int',    'active'),
  ('n_regionkey', 'int',    'active')
) AS t(column_name, data_type, status)
""",
    tags=("S1", "S5"),
)
def x_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution (glue_infra.py:101-104 semantics): three batches
    with drifting schemas land in one table; the evolved read unifies the
    schema (added col → UPDATE; removed col survives nullable →
    DEPRECATE). Returns the per-column status report."""
    import shutil

    from ..sources.evolution import append_batch, schema_report

    from .lakehouse import _scratch

    path = _scratch(f"x_evo_{sf_dir.strip('/').replace('/', '_')}")
    shutil.rmtree(path, ignore_errors=True)
    n = T(spark, sf_dir, "nation")
    append_batch(n.select("n_nationkey", "n_name"), path)
    append_batch(n.select("n_nationkey", "n_name", "n_regionkey"), path)
    append_batch(n.select("n_nationkey", "n_regionkey"), path)  # n_name dropped
    return schema_report(spark, path).orderBy("column_name")


@register(
    "x_percentiles",
    oracle="""
SELECT o_orderstatus AS status,
       ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50,
       ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90,
       ROUND(quantile_cont(o_totalprice, 0.99), 4) AS p99,
       ROUND(median(o_totalprice), 4) AS med
FROM orders
GROUP BY 1
""",
    tags=("A1", "A3"),
)
def x_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (p50/p90/p99 + median) per status.
    Both engines use the (n−1)·q linear-interpolation convention; results
    rounded to 4 dp (interpolation arithmetic is the only float step).
    At 100 TB the substitute is approx_percentile (t-digest sketch) —
    exact percentile requires a per-group sort."""
    o = T(spark, sf_dir, "orders")
    return o.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 4).alias("p90"),
        F.round(F.percentile("o_totalprice", F.lit(0.99)), 4).alias("p99"),
        F.round(F.median("o_totalprice"), 4).alias("med"),
    )


@register(
    "x_zorder_layout",
    oracle=f"""
SELECT CAST(year(o_orderdate) AS INT) AS yr,
       COUNT(*) AS n_orders,
       {sql_dsum("o_totalprice", scale=2)} AS revenue
FROM orders
GROUP BY 1
""",
    tags=("S3", "P4"),
)
def x_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering round-trip: orders re-laid-out along the Morton
    curve of (o_custkey, epoch-day) — multi-dimensional file skipping —
    then aggregated. Oracle = the same aggregate on the ORIGINAL table:
    clustering must be a pure layout change (tests/test_table_format.py
    asserts the per-file range tightening)."""
    from ..operators.zorder import z_order_by

    o = T(spark, sf_dir, "orders").withColumn(
        "o_day", F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
    )
    zed = z_order_by(o, ["o_custkey", "o_day"], n_partitions=8).drop("o_day")
    return zed.groupBy(F.year("o_orderdate").cast("int").alias("yr")).agg(
        F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice", scale=2).alias("revenue")
    )


@register(
    "x_approx_percentiles",
    oracle=None,  # sketch-based estimates are engine-specific → rows-only
    tags=("A3", "A1"),
)
def x_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (Greenwald-Khanna sketch, accuracy 10000) per
    status — the 100 TB profile-job substitute for `x_percentiles`: the
    sketch is partial-mergeable (no per-group sort, bounded memory per
    partition). Estimates are engine-specific → rows-only; the error-
    bound-vs-exact test lives in tests/test_llm_ops.py.

    Output is SCALAR columns (p50/p90/p99), never the raw array<double>:
    the driver's canonicalizer cannot hash list cells (r9's one red row —
    `TypeError: unhashable type: 'list'`); the check_oracle.py complex-type
    lint now covers rows-only queries too, so this class fails locally."""
    o = T(spark, sf_dir, "orders")
    agg = o.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.approx_percentile(
            "o_totalprice", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)), F.lit(10000)
        ).alias("approx_p"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    return agg.select(
        "status",
        F.element_at("approx_p", 1).alias("p50"),
        F.element_at("approx_p", 2).alias("p90"),
        F.element_at("approx_p", 3).alias("p99"),
        "n_orders",
    )


@register(
    "x_bucketed_colocated_join",
    oracle=f"""
SELECT o.o_orderpriority AS priority,
       COUNT(*) AS n_items,
       {sql_dsum("l.l_extendedprice * (1 - l.l_discount)")} AS revenue
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY 1
""",
    tags=("J1", "S3"),
)
def x_bucketed_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-shuffle fact⋈fact: orders and lineitem are written ONCE as
    co-bucketed tables (8 buckets on the order key, sorted), then joined —
    the SortMergeJoin's children are bare bucketed scans with no Exchange
    and no Sort (tools/explain_audit.py asserts it). At 100 TB this is the
    difference between shuffling two fact tables on every daily join and
    paying the shuffle once at ingest. Result ≡ the plain join (oracle)."""
    import shutil

    from ..sources.bucketing import bucketed_join, write_bucketed
    from .lakehouse import _scratch

    tag = sf_dir.strip("/").replace("/", "_").replace(".", "_")
    for tbl, src, key in (
        (f"rdl_orders_b_{tag}", "orders", "o_orderkey"),
        (f"rdl_lineitem_b_{tag}", "lineitem", "l_orderkey"),
    ):
        path = _scratch(tbl)
        shutil.rmtree(path, ignore_errors=True)
        df = T(spark, sf_dir, src).withColumnRenamed(key, "orderkey")
        write_bucketed(df, tbl, ["orderkey"], n_buckets=8, path=path)
    # bucketed_join enables the legacy one-file-per-bucket ordering conf so
    # the scan reports its sort order; materialize under it, then restore so
    # the extra file-listing cost doesn't leak into every later query.
    saved = spark.conf.get("spark.sql.legacy.bucketedTableScan.outputOrdering", "false")
    try:
        joined = bucketed_join(
            spark, f"rdl_orders_b_{tag}", f"rdl_lineitem_b_{tag}", on=["orderkey"]
        )
        res = joined.groupBy(F.col("o_orderpriority").alias("priority")).agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).alias(
                "revenue"
            ),
        )
        res = res.persist()
        res.count()
    finally:
        spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", saved)
    return res


@register(
    "x_salted_skew_join",
    oracle=f"""
SELECT n.n_name AS nation,
       COUNT(*) AS n_orders,
       {sql_dsum("o.o_totalprice", 2)} AS revenue
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
GROUP BY 1
""",
    tags=("J1", "A1"),
)
def x_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant join via explicit salting (operators/skew.py): the
    hot-key side is salted with a deterministic xxhash64-derived salt, the
    compact side exploded n_salts× — each hot key's rows spread over 8
    shuffle partitions instead of one straggler. Salting changes ONLY the
    shuffle layout; the oracle (plain join) proves the result is
    identical. This is the explicit fallback for skew AQE can't split
    (broadcast-ineligible medium dims on power-law keys)."""
    from ..operators.skew import salted_join

    o = T(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = T(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey"
    )
    n = T(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"), "n_name"
    )
    joined = salted_join(o, c, on="o_custkey", n_salts=8)
    return (
        joined.join(F.broadcast(n), "c_nationkey")
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", scale=2).alias("revenue"),
        )
    )


@register(
    "x_statistical_aggs",
    oracle="""
SELECT l_returnflag AS flag,
       ROUND(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
       ROUND(covar_pop(l_quantity, l_extendedprice), 4) AS qty_price_covar,
       ROUND(stddev_pop(l_quantity), 6) AS qty_stddev,
       ROUND(var_pop(l_quantity), 6) AS qty_var,
       ROUND(regr_slope(l_extendedprice, l_quantity), 6) AS price_per_qty,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY 1
""",
    tags=("A1",),
)
def x_statistical_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates per return flag: correlation, population
    covariance/stddev/variance, and the regression slope — single-pass
    moment aggregates (all partial-mergeable, so two-phase at 100 TB;
    population variants chosen because their definitions are identical
    across engines). 6 dp rounding bounds float-order drift."""
    li = T(spark, sf_dir, "lineitem")
    return li.groupBy(F.col("l_returnflag").alias("flag")).agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
        F.round(F.covar_pop("l_quantity", "l_extendedprice"), 4).alias("qty_price_covar"),
        F.round(F.stddev_pop("l_quantity"), 6).alias("qty_stddev"),
        F.round(F.var_pop("l_quantity"), 6).alias("qty_var"),
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 6).alias("price_per_qty"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "x_constraint_quarantine",
    oracle="""
SELECT 'custkey_not_null' AS rule,
       COUNT(*) FILTER (WHERE o_custkey IS NULL) AS n_rows
FROM orders
UNION ALL
SELECT 'price_positive' AS rule,
       COUNT(*) FILTER (WHERE NOT (o_totalprice > 0)) AS n_rows
FROM orders
UNION ALL
SELECT 'valid' AS rule,
       COUNT(*) FILTER (WHERE o_custkey IS NOT NULL AND o_totalprice > 0) AS n_rows
FROM orders
""",
    tags=("S1", "A6"),
)
def x_constraint_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-time CHECK constraints with quarantine (sources/constraints.py):
    the dirty bronze batch splits into valid rows and quarantined rows
    tagged with every violated rule — one scan, no UDF. Mirrors Delta's
    CHECK constraints, with the quarantine side the reference's dirty
    CSVs actually need (NULL custkeys ship in its datasets)."""
    from ..sources.constraints import quarantine, violation_counts

    o = T(spark, sf_dir, "orders")
    rules = {
        "custkey_not_null": F.col("o_custkey").isNotNull(),
        "price_positive": F.col("o_totalprice") > 0,
    }
    valid, _bad = quarantine(o, rules)
    per_rule = violation_counts(o, rules).select(
        F.col("constraint").alias("rule"), F.col("n_bad").alias("n_rows")
    )
    valid_row = valid.agg(
        F.lit("valid").alias("rule"), F.count(F.lit(1)).alias("n_rows")
    )
    return per_rule.unionByName(valid_row)


@register(
    "x_pseudonymize_join",
    oracle="""
WITH mc AS (
  SELECT md5('pz1:' || CAST(c_custkey AS VARCHAR)) AS pid,
         substr(md5('pz1:' || c_name), 1, 12) AS masked_name,
         c_mktsegment
  FROM customer),
mo AS (
  SELECT md5('pz1:' || CAST(o_custkey AS VARCHAR)) AS pid, o_totalprice
  FROM orders WHERE o_custkey IS NOT NULL)
SELECT c.c_mktsegment AS segment,
       COUNT(DISTINCT c.pid) AS n_customers,
       COUNT(o.o_totalprice) AS n_orders,
       CAST(ROUND(SUM(CAST(o.o_totalprice AS DECIMAL(25,2))), 2) AS DOUBLE)
         AS total_spend,
       MIN(c.masked_name) AS sample_mask
FROM mc c JOIN mo o ON c.pid = o.pid
GROUP BY 1
""",
    tags=("DQ", "F1", "J1"),
)
def x_pseudonymize_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GDPR-style pseudonymization that PRESERVES analytics: customer keys
    and names are replaced by salted-hash pseudonyms (a pure column map —
    the salt rotates per release, re-identification needs the salt), and
    the masked fact⋈dim join still works because the same deterministic
    pseudonym function is applied on both sides of the key. The oracle
    recomputes the identical masking and proves segment-level spend over
    the PSEUDONYMIZED join matches exactly — masking loses no referential
    integrity. At 100 TB this is a narrow map on both inputs followed by
    the normal hash join on the pseudonym (same partitioning behavior as
    the raw key: md5 is uniform), so the governance layer costs one
    projection, not a new join strategy."""
    pz = lambda c: F.md5(F.concat(F.lit("pz1:"), c.cast("string")).cast("binary"))  # noqa: E731
    cust = T(spark, sf_dir, "customer").select(
        pz(F.col("c_custkey")).alias("pid"),
        F.substring(pz(F.col("c_name")), 1, 12).alias("masked_name"),
        "c_mktsegment",
    )
    orders = (
        T(spark, sf_dir, "orders")
        .filter(F.col("o_custkey").isNotNull())
        .select(pz(F.col("o_custkey")).alias("pid"), "o_totalprice")
    )
    return (
        cust.join(orders, "pid")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count_distinct("pid").alias("n_customers"),
            F.count("o_totalprice").alias("n_orders"),
            dsum("o_totalprice", scale=2, out_round=2).alias("total_spend"),
            F.min("masked_name").alias("sample_mask"),
        )
    )


# ------------------------------------- serializable concurrent MERGE


_SER_MERGE_SQL = """
SELECT c_custkey,
       CASE WHEN c_custkey % 20 = 0 THEN 200000.0 + c_custkey
            WHEN c_custkey % 10 = 0 THEN 100000.0 + c_custkey
            WHEN c_custkey % 10 = 3 THEN 300000.0 + c_custkey
            WHEN c_custkey % 10 = 5 THEN 500000.0 + c_custkey
            ELSE c_acctbal END AS balance
FROM customer WHERE c_custkey <= 200
"""


@register("x_serializable_merge", oracle=_SER_MERGE_SQL, tags=("S7", "S6"), doc="")
def x_serializable_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-isolated concurrent MERGE conflict detection (the Delta
    ConcurrentModificationException contract on VersionedTable): each
    serializable merge records its key fingerprints in the manifest; a
    writer that loses the CAS race checks the intervening commits' write
    sets before rebasing — overlap aborts (the losing update must NOT
    appear in any committed version), disjoint writers rebase and ALL
    commit. The query replays a deterministic 3-race history and returns
    the final snapshot; the oracle recomputes it from the winners alone,
    so the hash proves the aborted overlap merge really left no trace.
    At 100 TB the check is manifest-metadata-only: O(|batch keys|)
    fingerprints per commit, no data-file reads."""
    import tempfile

    from ..sources.table_format import ConcurrentMergeConflict, VersionedTable

    base = (
        T(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 200)
        .select("c_custkey", F.col("c_acctbal").alias("balance"))
    )
    path = tempfile.mkdtemp(prefix="rdl_sermerge_")
    table = VersionedTable(spark, path)
    table.overwrite(base)  # v1

    def upd(mod: int, rem: int, base_val: float) -> DataFrame:
        return base.filter(F.col("c_custkey") % mod == rem).select(
            "c_custkey", (F.lit(base_val) + F.col("c_custkey")).alias("balance")
        )

    # v2: plain serializable merge, no race — %10==0 -> 100000+key
    table.merge(upd(10, 0, 100000.0), ["c_custkey"], isolation="serializable")

    # race 1 — OVERLAP: rival commits %20==0 -> 200000+key between our
    # read and CAS; our %20==0 -> 999999 merge must abort untraced.
    rival_tbl = VersionedTable(spark, path)

    def race(rival_updates: DataFrame, my_updates: DataFrame):
        state = {"fired": False}

        class Racing(VersionedTable):
            def _try_commit(self, df, op, parent, txn=None, modified_keys=None, **kw):
                if not state["fired"]:
                    state["fired"] = True
                    rival_tbl.merge(
                        rival_updates, ["c_custkey"], isolation="serializable"
                    )
                return super()._try_commit(
                    df, op, parent, txn=txn, modified_keys=modified_keys, **kw
                )

        Racing(spark, path).merge(my_updates, ["c_custkey"], isolation="serializable")

    try:
        race(upd(20, 0, 200000.0), upd(20, 0, 999999.0))
        raise AssertionError("overlapping serializable merges both committed")
    except ConcurrentMergeConflict:
        pass  # loser aborted; rival's 200000+key stands

    # race 2 — DISJOINT: rival takes %10==3, we take %10==5; the loser
    # detects no overlap, rebases, and both land.
    race(upd(10, 3, 300000.0), upd(10, 5, 500000.0))

    return table.read().select("c_custkey", F.col("balance").cast("double"))


# ------------------------------------------- file-level data skipping


_FILE_SKIP_SQL = """
WITH b AS (SELECT MAX(o_orderkey) // 20 AS lo FROM orders)
SELECT o_orderpriority, COUNT(*) AS n_orders,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(25,2))), 2) AS DOUBLE) AS revenue
FROM orders, b
WHERE o_orderkey BETWEEN b.lo AND 3 * b.lo
GROUP BY o_orderpriority
"""


@register("x_file_skipping", oracle=_FILE_SKIP_SQL, tags=("S4", "P4", "P2"), doc="")
def x_file_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-level min/max data skipping (sources/skipping.py — the Delta
    file-stats mechanism on plain parquet): orders are written
    range-clustered on o_orderkey into 16 files, per-file [min,max] is
    collected from parquet FOOTERS (driver metadata read, no Spark job),
    and a selective range query receives an explicitly pruned file list —
    asserted to open fewer than half the files. At 100 TB this is the
    difference between touching ~10% of the keyspace's files and listing/
    opening all of them; the oracle recomputes the same range aggregate
    from the full table, so the hash proves pruning lost no rows."""
    import tempfile

    from ..sources.skipping import collect_file_stats, skipping_scan, write_clustered

    o = T(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    path = tempfile.mkdtemp(prefix="rdl_skip_")
    write_clustered(o, path, "o_orderkey", n_files=16)
    stats = collect_file_stats(path, ["o_orderkey"])

    mx = max(s["o_orderkey_max"] for s in stats)
    lo = mx // 20
    hi = 3 * lo
    df, n_read, n_total = skipping_scan(spark, path, stats, "o_orderkey", lo, hi)
    # the pruning must actually engage: a ~10%-of-keyspace predicate over
    # 16 range-clustered files cannot need more than half of them
    assert n_read < n_total / 2, f"skipping read {n_read}/{n_total} files"

    return df.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice", scale=2, out_round=2).alias("revenue"),
    )


# -------------------------------------- Z-order multi-dimension skipping


_ZORDER_SKIP_SQL = """
WITH b AS (SELECT MAX(o_custkey) // 20 AS lo FROM orders)
SELECT o_orderpriority, COUNT(*) AS n_orders,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(25,2))), 2) AS DOUBLE) AS revenue
FROM orders, b
WHERE o_custkey BETWEEN b.lo AND 3 * b.lo
GROUP BY o_orderpriority
"""


@register("x_zorder_skipping", oracle=_ZORDER_SKIP_SQL, tags=("S4", "P4", "P2"), doc="")
def x_zorder_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-dimensional file skipping from ONE layout: orders written
    along the Z-curve of (o_orderkey, o_custkey) into 16 files
    (operators/zorder.py), per-file [min,max] footer stats collected for
    BOTH columns — and a selective predicate on EITHER dimension prunes
    files (asserted for both), which linear clustering can only do for
    its sort column (every file would span the full secondary range).
    This is why Z-order exists: the layout that lets a 100 TB table serve
    selective scans on k dimensions from one copy of the data. The
    returned aggregate filters on the SECONDARY dimension (o_custkey) and
    hash-matches the full-table oracle — pruning lost nothing."""
    import tempfile

    from ..operators.zorder import z_order_by
    from ..sources.skipping import collect_file_stats, skipping_scan

    o = T(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice"
    )
    path = tempfile.mkdtemp(prefix="rdl_zskip_")
    z_order_by(o, ["o_orderkey", "o_custkey"], n_partitions=16).write.mode(
        "overwrite"
    ).parquet(path)
    stats = collect_file_stats(path, ["o_orderkey", "o_custkey"])

    # dimension 1: a ~10%-band o_orderkey predicate prunes files
    mxk = max(s["o_orderkey_max"] for s in stats)
    _, n1, n_total = skipping_scan(
        spark, path, stats, "o_orderkey", mxk // 20, 3 * (mxk // 20)
    )
    assert n1 < n_total, f"orderkey dim unprunable: {n1}/{n_total}"

    # dimension 2 (the one linear clustering cannot serve): same band on
    # o_custkey — this is the scan the query returns
    mxc = max(s["o_custkey_max"] for s in stats)
    lo = mxc // 20
    df, n2, _ = skipping_scan(spark, path, stats, "o_custkey", lo, 3 * lo)
    assert n2 < n_total, f"custkey dim unprunable: {n2}/{n_total}"

    return df.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice", scale=2, out_round=2).alias("revenue"),
    )


# --------------------------------------- per-file bloom point lookup


_BLOOM_LOOKUP_SQL = """
WITH t AS (SELECT MAX(o_orderkey) // 2 AS half FROM orders),
k AS (SELECT MAX(o_orderkey) AS key FROM orders, t WHERE o_orderkey <= t.half)
SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice
FROM orders, k WHERE o_orderkey = k.key
"""


@register("x_point_lookup_bloom", oracle=_BLOOM_LOOKUP_SQL, tags=("S4", "P4", "P3"), doc="")
def x_point_lookup_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-grain file skipping where zone maps FAIL: orders are
    clustered by o_custkey, so a point lookup on o_orderkey (uncorrelated
    with the layout) finds nearly every file's [min,max] spanning the
    probe — min/max prunes nothing (asserted). The per-file Bloom stats
    (sources/skipping.py — parquet's optional bloom-filter feature as a
    reader-owned stats layer, built in ONE distributed bit_or pass) prune
    the same lookup to at most a few candidate files (asserted), which
    are the only ones opened. This is how a 100 TB table serves key
    lookups on a non-clustering column without a secondary index copy of
    the data. The oracle selects the same row arithmetically."""
    import tempfile

    from ..sources.skipping import (
        bloom_lookup_files,
        build_file_bloom_stats,
        collect_file_stats,
        write_clustered,
    )

    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    path = tempfile.mkdtemp(prefix="rdl_bloomlkp_")
    write_clustered(o, path, "o_custkey", n_files=16)

    mx = o.agg(F.max("o_orderkey")).first()[0]
    key = o.filter(F.col("o_orderkey") <= mx // 2).agg(F.max("o_orderkey")).first()[0]

    # zone maps are useless here: the probe key falls inside almost every
    # file's o_orderkey span (uncorrelated with the custkey clustering)
    mm = collect_file_stats(path, ["o_orderkey"])
    n_mm = sum(1 for s in mm if s["o_orderkey_min"] <= key <= s["o_orderkey_max"])
    assert n_mm > len(mm) / 2, f"zone maps unexpectedly selective: {n_mm}/{len(mm)}"

    blooms = build_file_bloom_stats(spark, path, "o_orderkey")
    cand = bloom_lookup_files(spark, blooms, key)
    assert 1 <= len(cand) <= 3, f"bloom pruned to {len(cand)}/{len(mm)} files"

    import os

    df = spark.read.parquet(*[os.path.join(path, f) for f in cand])
    return df.filter(F.col("o_orderkey") == key).select(
        "o_orderkey", "o_custkey", F.col("o_totalprice").cast("double")
    )


# --------------------------------------------- compaction + file counts


_COMPACT_SQL = """
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(25,2))), 2) AS DOUBLE) AS revenue
FROM orders GROUP BY o_orderpriority
"""


@register("x_compaction_rewrite", oracle=_COMPACT_SQL, tags=("S6", "S3"), doc="")
def x_compaction_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-files OPTIMIZE as a gated query: the table arrives
    fragmented into 24 small files (the streaming-ingest residue);
    `compact` rewrites the snapshot into 4 right-sized files as a NEW
    version — asserted: file count drops, row count doesn't, and time
    travel to the pre-compaction version still resolves. The returned
    aggregate over the compacted table hash-matches the full-table
    oracle, proving the rewrite changed layout only. At 100 TB this is
    the scheduled maintenance job that keeps per-file open/footer costs
    off every scan."""
    import os
    import tempfile

    from ..sources.table_format import VersionedTable, compact

    o = T(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    table = VersionedTable(spark, tempfile.mkdtemp(prefix="rdl_compact_"))
    # the streaming-ingest residue: one snapshot fragmented into 24 small
    # files (repartition(24) at write — the file layout per-trigger
    # ingest accumulates, without paying 24 commit rewrites here)
    table.overwrite(o.repartition(24))
    v_small = table.current_version()

    def n_files(version: int) -> int:
        d = os.path.join(table.path, table._manifest(version)["data_dir"])
        return sum(1 for f in os.listdir(d) if f.endswith(".parquet"))

    v_compact = compact(table, target_partitions=4)
    assert n_files(v_compact) < n_files(v_small) / 2, "compaction did not shrink files"
    assert n_files(v_compact) <= 4
    # time travel across the compaction boundary still works
    assert table.read_version(v_small).count() == table.read().count()

    return table.read().groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice", scale=2, out_round=2).alias("revenue"),
    )


# ------------------------------------------------ GDPR delete + vacuum


_VACUUM_SQL = """
SELECT c_mktsegment,
       COUNT(*) AS n_customers,
       CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(25,2))), 2) AS DOUBLE) AS total_balance
FROM customer
WHERE c_custkey % 10 <> 3
GROUP BY c_mktsegment
"""


@register("x_vacuum_gdpr", oracle=_VACUUM_SQL, tags=("S6", "S7"), doc="")
def x_vacuum_gdpr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten, END-TO-END: DELETE commits a snapshot
    without the erased customers, then vacuum(retain_last=1) expires
    every older snapshot — asserted: the erased keys are not just
    invisible to readers but PHYSICALLY GONE from disk (no parquet file
    under the table root contains them; pre-delete versions no longer
    resolve). The oracle recomputes the surviving aggregate
    arithmetically, proving the erasure was exact. Delta's documented
    GDPR recipe (DELETE + VACUUM) on the engine's table format."""
    import os
    import tempfile

    from ..sources.table_format import VersionedTable

    c = T(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment", "c_acctbal")
    table = VersionedTable(spark, tempfile.mkdtemp(prefix="rdl_gdpr_"))
    table.overwrite(c)  # v1
    v1 = table.current_version()
    table.delete("c_custkey % 10 = 3")  # v2
    removed = table.vacuum(retain_last=1, orphan_retention_s=0.0)
    assert removed, "vacuum expired nothing"

    # physical erasure: no parquet file under the table still holds an
    # erased key (footer-only would not prove it; re-scan the survivors)
    leftovers = (
        spark.read.parquet(
            *[
                os.path.join(r, f)
                for r, _, fs in os.walk(table.path)
                for f in fs
                if f.endswith(".parquet")
            ]
        )
        .filter(F.col("c_custkey") % 10 == 3)
        .count()
    )
    assert leftovers == 0, f"{leftovers} erased rows still on disk"
    try:
        table.read_version(v1)
        raise AssertionError("pre-delete snapshot still readable after vacuum")
    except (FileNotFoundError, ValueError):
        pass  # manifest expired (ValueError) or data dir gone

    return table.read().groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        dsum("c_acctbal", scale=2, out_round=2).alias("total_balance"),
    )


# ------------------------------------------------- time-travel reads


_TIME_TRAVEL_SQL = """
SELECT 1 AS version, COUNT(*) AS n_orders,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(25,2))), 2) AS DOUBLE) AS revenue
FROM orders
UNION ALL
SELECT 2 AS version, COUNT(*) AS n_orders,
       CAST(ROUND(SUM(CAST(CASE WHEN o_orderkey % 5 = 0 THEN 2 * o_totalprice
                                 ELSE o_totalprice END AS DECIMAL(25,2))), 2) AS DOUBLE) AS revenue
FROM orders
"""


@register("x_time_travel_agg", oracle=_TIME_TRAVEL_SQL, tags=("S6", "S7"), doc="")
def x_time_travel_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel as a gated query: v1 snapshots the raw orders, v2
    MERGEs a repricing (keys % 5 == 0 doubled), and the SAME aggregate is
    read AT BOTH VERSIONS — the reproducible-training-snapshot contract:
    any pipeline run can be re-executed against the exact table state it
    saw, after arbitrary later writes. The oracle recomputes both
    versions arithmetically from the raw table, so the hash proves
    version isolation (v1 is untouched by v2's merge)."""
    import tempfile

    from ..sources.table_format import VersionedTable

    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    table = VersionedTable(spark, tempfile.mkdtemp(prefix="rdl_tt_"))
    table.overwrite(o)  # v1
    repriced = o.filter(F.col("o_orderkey") % 5 == 0).select(
        "o_orderkey", (F.col("o_totalprice") * 2).alias("o_totalprice")
    )
    table.merge(repriced, ["o_orderkey"])  # v2

    outs = []
    for v in (1, 2):
        outs.append(
            table.read_version(v).agg(
                F.lit(v).alias("version"),
                F.count(F.lit(1)).alias("n_orders"),
                dsum("o_totalprice", scale=2, out_round=2).alias("revenue"),
            )
        )
    return outs[0].unionByName(outs[1])


_BRANCH_TAGS_SQL = f"""
SELECT 'branch:dev' AS ref, COUNT(*) AS n_rows,
       {sql_dsum("CASE WHEN o_orderkey % 7 = 0 THEN 2 * o_totalprice ELSE o_totalprice END", scale=2)} AS revenue
FROM orders
UNION ALL
SELECT 'main', COUNT(*) + (SELECT COUNT(*) FROM orders WHERE o_orderkey % 11 = 0),
       {sql_dsum("CASE WHEN o_orderkey % 11 = 0 THEN 4 * o_totalprice ELSE o_totalprice END", scale=2)}
FROM orders
UNION ALL
SELECT 'tag:train_v1', COUNT(*), {sql_dsum("o_totalprice", scale=2)}
FROM orders
"""


@register("x_branch_tags", oracle=_BRANCH_TAGS_SQL, tags=("S6", "S7"), doc="")
def x_branch_tags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg-style TABLE REFS: a tag pins v1 forever ('train_v1' — the
    reproducible-training-snapshot pin), a branch forks an independent
    dev lineage at v1, and the three lineages then diverge: dev MERGEs a
    repricing (keys %7 doubled), main APPENDs late orders (keys %11
    re-delivered at 3x as distinct negative keys). The hash proves full
    three-way isolation — the tag still reads exactly v1 after both
    writes, dev sees its merge but not main's append, main sees its
    append but not dev's merge. Both refs are metadata-only (the branch
    fork copies one manifest entry, zero data), which is what makes
    branch-per-experiment viable on a 100 TB table. Version arithmetic
    is asserted in-query; vacuum treats both refs as GC roots (pinned by
    tests)."""
    import tempfile

    from ..sources.table_format import VersionedTable

    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    table = VersionedTable(spark, tempfile.mkdtemp(prefix="rdl_refs_"))
    table.overwrite(o)  # v1
    table.tag("train_v1")  # pin v1
    dev = table.create_branch("dev")  # fork at v1

    repriced = o.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey", (F.col("o_totalprice") * 2).alias("o_totalprice")
    )
    dev.merge(repriced, ["o_orderkey"])  # dev head = v2 (branch namespace)

    late = o.filter(F.col("o_orderkey") % 11 == 0).select(
        (-F.col("o_orderkey")).alias("o_orderkey"),
        (F.col("o_totalprice") * 3).alias("o_totalprice"),
    )
    table.append(late)  # main v2

    # lineage isolation, asserted structurally before the value hash:
    assert table.current_version() == 2 and dev.current_version() == 2
    assert {r["name"]: r["type"] for r in table.refs()} == {
        "dev": "branch", "train_v1": "tag",
    }

    def summarize(label: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(label).alias("ref"),
            F.count(F.lit(1)).alias("n_rows"),
            dsum("o_totalprice", scale=2, out_round=2).alias("revenue"),
        )

    return (
        summarize("branch:dev", table.read_ref("dev"))
        .unionByName(summarize("main", table.read()))
        .unionByName(summarize("tag:train_v1", table.read_ref("train_v1")))
    )


_ROLLBACK_SQL = f"""
SELECT 1 AS version, 'overwrite' AS operation, COUNT(*) AS n_rows,
       {sql_dsum("o_totalprice", scale=2)} AS revenue
FROM orders
UNION ALL
SELECT 2, 'overwrite', COUNT(*), {sql_dsum("100 * o_totalprice", scale=2)}
FROM orders
UNION ALL
SELECT 3, 'restore', COUNT(*), {sql_dsum("o_totalprice", scale=2)}
FROM orders
UNION ALL
SELECT 4, 'append', COUNT(*) + (SELECT COUNT(*) FROM orders WHERE o_orderkey % 13 = 0),
       {sql_dsum("CASE WHEN o_orderkey % 13 = 0 THEN 3 * o_totalprice ELSE o_totalprice END", scale=2)}
FROM orders
"""


@register("x_snapshot_rollback", oracle=_ROLLBACK_SQL, tags=("S6", "S7"), doc="")
def x_snapshot_rollback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta RESTORE as a gated query: v2 is a corrupted ETL run (every
    price 100x), v3 = restore(v1) rolls BACK by rolling FORWARD (the bad
    version stays in history — auditable, still time-travelable — and no
    reader ever sees a version vanish), v4 appends normally on top of the
    restored state. The output reads ALL FOUR versions plus each commit's
    recorded operation, so the hash proves the restore reproduced v1
    bit-for-bit, the corruption remains visible at v2, and post-restore
    writes build on the restored content."""
    import tempfile

    from ..sources.table_format import VersionedTable

    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    table = VersionedTable(spark, tempfile.mkdtemp(prefix="rdl_restore_"))
    table.overwrite(o)  # v1: good load
    table.overwrite(
        o.select("o_orderkey", (F.col("o_totalprice") * 100).alias("o_totalprice"))
    )  # v2: corrupted rerun
    table.restore(1)  # v3: roll back to v1's content
    late = o.filter(F.col("o_orderkey") % 13 == 0).select(
        (-F.col("o_orderkey")).alias("o_orderkey"),
        (F.col("o_totalprice") * 2).alias("o_totalprice"),
    )
    table.append(late)  # v4: life goes on

    outs = []
    for entry in table.history():
        outs.append(
            table.read_version(entry["version"]).agg(
                F.lit(entry["version"]).alias("version"),
                F.lit(entry["operation"]).alias("operation"),
                F.count(F.lit(1)).alias("n_rows"),
                dsum("o_totalprice", scale=2, out_round=2).alias("revenue"),
            )
        )
    out = outs[0]
    for df in outs[1:]:
        out = out.unionByName(df)
    return out


_REPLACE_WHERE_SQL = f"""
WITH base AS (
  SELECT o_orderkey, o_totalprice,
         CAST(date_trunc('month', o_orderdate) AS DATE) AS month
  FROM orders
  UNION ALL
  -- unknown-month rows: the predicate evaluates NULL on them, and Delta's
  -- replaceWhere RETAINS such rows (they did not match the slice)
  SELECT o_orderkey, o_totalprice, NULL FROM orders WHERE o_orderkey % 97 = 0
)
SELECT month, COUNT(*) AS n_orders,
       {sql_dsum("CASE WHEN month = DATE '1995-03-01'"
                 " THEN 2 * o_totalprice ELSE o_totalprice END", scale=2)} AS revenue
FROM base
GROUP BY 1
"""


@register("x_replace_where", oracle=_REPLACE_WHERE_SQL, tags=("S3", "S6", "S7"), doc="")
def x_replace_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta ``replaceWhere`` — the idempotent backfill: the orders mart
    is laid out hive-partitioned by month, a re-run of March 1995's
    pipeline produces corrected rows (2x repricing), and ONE atomic
    commit swaps exactly that month's slice. The hash over ALL months
    proves the two replaceWhere guarantees at once: the target month is
    fully replaced, and every other month is carried over untouched. The
    guard clause (replacement rows must match the predicate) is asserted
    in-query — a stray-row backfill must refuse to commit. At 100 TB
    this plus partition pruning is the daily-reprocessing path: the
    commit cost is O(slice), readers never see a half-replaced month."""
    import tempfile

    from ..sources.table_format import VersionedTable

    base = T(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_totalprice",
        F.date_trunc("month", "o_orderdate").cast("date").alias("month"),
    )
    # unknown-month rows: `month == X` evaluates NULL on them, and Delta's
    # replaceWhere contract keeps them (NULL is not-matched, not matched) —
    # the slice they'd silently vanish from under a plain `~cond` filter
    null_month = base.filter(F.col("o_orderkey") % 97 == 0).select(
        "o_orderkey", "o_totalprice", F.lit(None).cast("date").alias("month")
    )
    o = base.unionByName(null_month)
    table = VersionedTable(spark, tempfile.mkdtemp(prefix="rdl_rw_"))
    table.overwrite(o, partition_by=["month"])  # v1: monthly layout

    target = F.col("month") == F.lit("1995-03-01").cast("date")
    corrected = base.filter(target).select(
        "o_orderkey", (F.col("o_totalprice") * 2).alias("o_totalprice"), "month"
    )
    # guard: a backfill carrying rows outside its declared slice must fail
    try:
        table.overwrite_where(base.limit(5), target, partition_by=["month"])
        raise AssertionError("stray-row backfill must be rejected")
    except ValueError:
        pass
    # guard: a NULL-predicate replacement row is OUTSIDE the slice too —
    # it must not leak into the commit (the stray check is NULL-safe)
    try:
        table.overwrite_where(
            corrected.unionByName(null_month.limit(1)), target, partition_by=["month"]
        )
        raise AssertionError("NULL-predicate replacement row must be rejected")
    except ValueError:
        pass
    table.overwrite_where(corrected, target, partition_by=["month"])  # v2

    return table.read().groupBy("month").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice", scale=2, out_round=2).alias("revenue"),
    )


_WAP_BRANCH_SQL = f"""
SELECT 1 AS version, 'overwrite' AS operation, COUNT(*) AS n_rows,
       {sql_dsum("o_totalprice", scale=2)} AS revenue
FROM orders
UNION ALL
SELECT 2, 'publish', COUNT(*) + (SELECT COUNT(*) FROM orders WHERE o_orderkey % 17 = 0),
       {sql_dsum("CASE WHEN o_orderkey % 17 = 0 THEN 3 * o_totalprice ELSE o_totalprice END", scale=2)}
FROM orders
"""


@register("x_wap_branch", oracle=_WAP_BRANCH_SQL, tags=("S6", "S7"), doc="")
def x_wap_branch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Branch-based write-audit-publish with a ZERO-COPY publish (Iceberg
    fast-forward): today's ingest appends to an isolated 'wap' branch —
    main's readers are untouched while the audit runs — and the passing
    audit publishes by committing a main manifest that POINTS AT the
    branch head's data directory (metadata-only, asserted in-query: the
    published version's data_dir equals the branch head's, no rewrite).
    The per-version readback proves main served v1 throughout the audit
    window and serves the audited content at v2. This is the refs-era
    upgrade of x_write_audit_publish's staging-table swap: at 100 TB the
    publish costs one manifest write instead of an O(snapshot) copy."""
    import tempfile

    from ..sources.table_format import VersionedTable

    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    table = VersionedTable(spark, tempfile.mkdtemp(prefix="rdl_wap_"))
    table.overwrite(o)  # main v1
    wap = table.create_branch("wap")
    staged = o.filter(F.col("o_orderkey") % 17 == 0).select(
        (-F.col("o_orderkey")).alias("o_orderkey"),
        (F.col("o_totalprice") * 2).alias("o_totalprice"),
    )
    wap.append(staged)  # branch-only: main still serves v1

    # the AUDIT, on the branch: no nulls, no zero prices, row math adds up
    audited = wap.read()
    bad = audited.filter(
        F.col("o_orderkey").isNull() | (F.col("o_totalprice") <= 0)
    ).limit(1).collect()
    assert not bad and table.current_version() == 1

    table.publish_branch("wap")  # main v2, zero-copy
    m2 = table._manifest(2)
    assert m2["data_dir"] == wap._manifest(wap.current_version())["data_dir"]
    assert m2["published_from"] == {"branch": "wap", "version": 2}

    outs = []
    for v in (1, 2):
        outs.append(
            table.read_version(v).agg(
                F.lit(v).alias("version"),
                F.lit(table._manifest(v)["operation"]).alias("operation"),
                F.count(F.lit(1)).alias("n_rows"),
                dsum("o_totalprice", scale=2, out_round=2).alias("revenue"),
            )
        )
    return outs[0].unionByName(outs[1])


_RECURSIVE_SQL = f"""
WITH RECURSIVE walk(node, a, depth) AS (
  SELECT p_partkey AS node, p_partkey AS a, 1 AS depth FROM part
  UNION ALL
  SELECT node, a // 8 AS a, depth + 1 FROM walk WHERE a // 8 > 0
),
branch AS (
  SELECT node, a AS root_child FROM walk WHERE a BETWEEN 1 AND 7
),
depths AS (
  SELECT node, MAX(depth) AS chain_len FROM walk GROUP BY node
)
SELECT b.root_child,
       COUNT(*) AS n_nodes,
       CAST(MAX(d.chain_len) AS BIGINT) AS max_depth,
       {sql_dsum("p.p_retailprice", scale=2)} AS subtree_value
FROM branch b
JOIN depths d USING (node)
JOIN part p ON p.p_partkey = b.node
GROUP BY 1
"""


@register("x_recursive_hierarchy", oracle=_RECURSIVE_SQL, tags=("A1", "J1"), doc="")
def x_recursive_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RECURSIVE CTE (new SQL surface in Spark 4): walk a synthetic part
    hierarchy (parent = key DIV 8, root 0) to its top-level branches and
    roll up each branch's node count, max chain depth, and subtree value
    — the BOM-explosion / org-chart shape that previously needed a
    driver-side iteration loop (graph.py) or a bounded self-join ladder.
    The oracle is the SAME recursive SQL in DuckDB (`//` for DIV), so
    the hash pins Spark's recursion semantics — per-iteration UNION ALL
    expansion with a termination predicate — against an independent
    implementation. Scale note: each recursion step is one narrow
    self-map (no joins); depth is log_8(keyspace), so a 100 TB part
    catalog walks in ~10 micro-iterations; the rollup shuffles once on
    the branch key."""
    from ..catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
WITH RECURSIVE walk(node, a, depth) AS (
  SELECT p_partkey AS node, p_partkey AS a, 1 AS depth FROM part
  UNION ALL
  SELECT node, a DIV 8 AS a, depth + 1 FROM walk WHERE a DIV 8 > 0
),
branch AS (
  SELECT node, a AS root_child FROM walk WHERE a BETWEEN 1 AND 7
),
depths AS (
  SELECT node, MAX(depth) AS chain_len FROM walk GROUP BY node
)
SELECT b.root_child,
       COUNT(*) AS n_nodes,
       CAST(MAX(d.chain_len) AS BIGINT) AS max_depth,
       CAST(ROUND(SUM(CAST(p.p_retailprice AS DECIMAL(25,2))), 2) AS DOUBLE)
         AS subtree_value
FROM branch b
JOIN depths d USING (node)
JOIN part p ON p.p_partkey = b.node
GROUP BY 1
"""
    )


_MULTI_TXN_SQL = f"""
SELECT 'month' AS src, CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS VARCHAR) AS k,
       COUNT(*) AS n, {sql_dsum("o_totalprice", scale=2)} AS val
FROM orders GROUP BY 2
UNION ALL
SELECT 'segment', c_mktsegment, COUNT(*), {sql_dsum("c_acctbal", scale=2)}
FROM customer GROUP BY 2
"""


@register("x_multi_table_txn", oracle=_MULTI_TXN_SQL, tags=("S6", "S7"), doc="")
def x_multi_table_txn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table ATOMIC transaction (LakehouseTransaction, sources/
    table_format.py): one ETL run publishes TWO marts — monthly revenue
    and segment balances — with a single commit point, so a consumer
    joining them can never see one refreshed and the other stale (the
    per-sink-watermark gap t15_multi_sink_fanout documents). The query
    runs the full drill in-line: v1 publishes both marts from a stale
    slice atomically; a second transaction stages a NEW month mart and
    then FAILS before its commit point — both marts must still read the
    stale v1 (all-or-nothing, asserted); the third transaction publishes
    both full marts atomically. Output = the two published marts, which
    the oracle recomputes from the raw tables — hash-proof the committed
    state is exactly the full refresh, nothing half-applied. Commit cost
    is O(tables) driver-side metadata (one pending manifest each + one
    marker link); snapshot writes stay distributed."""
    import os
    import tempfile

    from ..sources.table_format import LakehouseTransaction, VersionedTable

    o = T(spark, sf_dir, "orders").select(
        "o_totalprice", F.date_trunc("month", "o_orderdate").cast("date").alias("month")
    )
    c = T(spark, sf_dir, "customer").select("c_mktsegment", "c_acctbal")

    def month_mart(df: DataFrame) -> DataFrame:
        return df.groupBy("month").agg(
            F.count(F.lit(1)).alias("n"), dsum("o_totalprice", scale=2).alias("val")
        )

    def seg_mart(df: DataFrame) -> DataFrame:
        return df.groupBy("c_mktsegment").agg(
            F.count(F.lit(1)).alias("n"), dsum("c_acctbal", scale=2).alias("val")
        )

    base = tempfile.mkdtemp(prefix="rdl_mtxn_")
    mart_m = VersionedTable(spark, os.path.join(base, "mart_month"))
    mart_s = VersionedTable(spark, os.path.join(base, "mart_segment"))
    txn_root = os.path.join(base, "_txns")

    stale = F.year("month") <= 1994
    with LakehouseTransaction(txn_root) as tx:  # v1: both marts, stale slice
        tx.overwrite(mart_m, month_mart(o.filter(stale)))
        tx.overwrite(mart_s, seg_mart(c.limit(50)))
    n_m1, n_s1 = mart_m.read().count(), mart_s.read().count()

    # a refresh that dies AFTER staging one mart but BEFORE the commit
    # point must leave BOTH marts at v1 — the atomicity this operator adds
    try:
        with LakehouseTransaction(txn_root) as tx:
            tx.overwrite(mart_m, month_mart(o))
            raise RuntimeError("injected failure before commit point")
    except RuntimeError:
        pass
    assert mart_m.current_version() == 1 and mart_m.read().count() == n_m1
    assert mart_s.current_version() == 1 and mart_s.read().count() == n_s1

    with LakehouseTransaction(txn_root) as tx:  # v2: the real full refresh
        tx.overwrite(mart_m, month_mart(o))
        tx.overwrite(mart_s, seg_mart(c))
    assert mart_m.current_version() == mart_s.current_version() == 2

    m = mart_m.read().select(
        F.lit("month").alias("src"),
        F.col("month").cast("string").alias("k"),
        "n",
        "val",
    )
    s = mart_s.read().select(
        F.lit("segment").alias("src"), F.col("c_mktsegment").alias("k"), "n", "val"
    )
    return m.unionByName(s)


_MANIFEST_PRUNE_SQL = f"""
SELECT CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS VARCHAR) AS month,
       COUNT(*) AS n_orders, {sql_dsum("o_totalprice", scale=2)} AS revenue
FROM orders
WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate <= TIMESTAMP '1995-06-30'
GROUP BY 1
"""


@register("x_manifest_pruning", oracle=_MANIFEST_PRUNE_SQL, tags=("S4", "S6", "P4"), doc="")
def x_manifest_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest-level min/max scan planning (VersionedTable.read_pruned):
    commits record per-file [min, max] from the parquet footers INTO the
    snapshot manifest (the footer walk the row-count stat already paid),
    and a range scan plans its file list from that one JSON — no
    directory listing, no footer reads, Iceberg's manifest-pruning shape.
    The table is written range-clustered on o_orderdate (16 files, each
    covering ~1/16 of the date range), the scan asks for six months, and
    the in-query audit asserts files were actually skipped at PLAN time.
    The residual filter handles file-grain overlap; the oracle is the
    plain relational answer, so the hash proves pruning lost nothing.
    This upgrades x_file_skipping (stats collected file-side at query
    time) to stats-at-commit: at 100 TB planning costs O(1) manifest
    reads instead of O(files) object-store LIST+footer fetches."""
    import datetime
    import tempfile

    from ..sources.table_format import VersionedTable

    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice", "o_orderdate")
    t = VersionedTable(spark, tempfile.mkdtemp(prefix="rdl_mprune_"))
    # declared clustering: each file covers a narrow o_orderdate slice
    t.overwrite(o, cluster_by=["o_orderdate"])
    assert t._manifest(1)["cluster_by"] == ["o_orderdate"]  # layout recorded

    lo = datetime.datetime(1995, 1, 1)
    hi = datetime.datetime(1995, 6, 30)
    df, n_read, n_total = t.read_pruned("o_orderdate", lo, hi)
    # the whole point: planning (manifest-only) dropped files
    assert 0 < n_read < n_total, (n_read, n_total)
    # and a disjoint range reads NOTHING
    _, n0, _ = t.read_pruned(
        "o_orderdate", datetime.datetime(2099, 1, 1), datetime.datetime(2099, 12, 31)
    )
    assert n0 == 0

    return df.groupBy(
        F.date_trunc("month", "o_orderdate").cast("date").cast("string").alias("month")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice", scale=2).alias("revenue"),
    )


_STATS_AGG_SQL = """
SELECT 'o_orderkey' AS col,
       CAST(MIN(o_orderkey) AS DOUBLE) AS vmin,
       CAST(MAX(o_orderkey) AS DOUBLE) AS vmax,
       COUNT(*) AS n_rows
FROM orders
UNION ALL
SELECT 'o_totalprice', CAST(MIN(o_totalprice) AS DOUBLE),
       CAST(MAX(o_totalprice) AS DOUBLE), COUNT(*)
FROM orders
"""


@register("x_stats_agg", oracle=_STATS_AGG_SQL, tags=("S6", "A1"), doc="")
def x_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-ONLY aggregates (VersionedTable.stats_agg): MIN / MAX /
    COUNT answered purely from the manifest's per-file stats — the query
    side runs ZERO Spark jobs over the data (the result DataFrame is
    built from the driver-side dict). This is the Delta/Iceberg
    metadata-query optimization: at 100 TB `SELECT MIN(ts), MAX(ts),
    COUNT(*)` on an append-heavy table is an O(files-in-manifest) driver
    read, not a scan. The oracle computes the same three aggregates
    relationally — hash-equality proves the commit-time footer stats are
    exact, not approximate."""
    import tempfile

    from ..sources.table_format import VersionedTable

    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    t = VersionedTable(spark, tempfile.mkdtemp(prefix="rdl_statsagg_"))
    # two commits so the stats compose across files from different writes
    half = o.agg((F.max("o_orderkey") / 2).cast("long")).first()[0]
    t.overwrite(o.filter(F.col("o_orderkey") <= half))
    t.append(o.filter(F.col("o_orderkey") > half))

    rows = []
    for c in ("o_orderkey", "o_totalprice"):
        s = t.stats_agg(c)
        assert s is not None, f"manifest stats missing for {c}"
        rows.append((c, float(s["min"]), float(s["max"]), int(s["n_rows"])))
    return spark.createDataFrame(
        rows, "col string, vmin double, vmax double, n_rows long"
    )


_POINT_MANIFEST_SQL = """
WITH probes AS (
  SELECT MAX(o_orderkey) // 7 AS k FROM orders
  UNION ALL SELECT MAX(o_orderkey) // 3 FROM orders
  UNION ALL SELECT (2 * MAX(o_orderkey)) // 3 FROM orders
  UNION ALL SELECT MAX(o_orderkey) FROM orders
)
SELECT o.o_orderkey AS k, o.o_totalprice,
       CAST(year(o.o_orderdate) AS BIGINT) AS y
FROM orders o JOIN probes p ON o.o_orderkey = p.k
"""


@register("x_point_lookup_manifest", oracle=_POINT_MANIFEST_SQL, tags=("S6", "P4"), doc="")
def x_point_lookup_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point/IN-list lookup planned from MANIFEST stats
    (VersionedTable.read_pruned_in): on a key-clustered snapshot, an
    IN-list of four derived keys reads only the files whose [min, max]
    contains a probed key — planned with zero listing and zero footer
    reads, asserted in-query. The companion of x_point_lookup_bloom
    (value-grain bloom stats, collected file-side): zone maps in the
    manifest are the FIRST line of point-lookup pruning at 100 TB; blooms
    refine the survivors when the probe column is uncorrelated with the
    clustering key. Probe keys derive from MAX-key arithmetic (mirrored
    in the oracle), so the lookup is scale-independent; keys that don't
    exist return no row in either engine."""
    import tempfile

    from ..sources.table_format import VersionedTable

    o = T(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", F.year("o_orderdate").cast("long").alias("y")
    )
    t = VersionedTable(spark, tempfile.mkdtemp(prefix="rdl_pointman_"))
    t.overwrite(o, cluster_by=["o_orderkey"])

    mx = o.agg(F.max("o_orderkey")).first()[0]
    probes = [mx // 7, mx // 3, (2 * mx) // 3, mx]
    df, n_read, n_total = t.read_pruned_in("o_orderkey", probes)
    assert 0 < n_read < n_total, (n_read, n_total)  # manifest really pruned
    return df.select(F.col("o_orderkey").alias("k"), "o_totalprice", "y")


_H32E = (
    "list_sum([ (strpos('0123456789abcdef', substr(md5({sig}), i, 1)) - 1)"
    " * CAST(16 ** (8 - i) AS BIGINT) for i in range(1, 9)])"
)

_POINT_BLOOM_SQL = f"""
WITH mx AS (SELECT MAX(o_orderkey) AS m FROM orders),
probes AS (
  SELECT {_H32E.format(sig="CAST(m // 7 AS VARCHAR)")} AS hk FROM mx
  UNION ALL SELECT {_H32E.format(sig="CAST(m // 3 AS VARCHAR)")} FROM mx
  UNION ALL SELECT {_H32E.format(sig="CAST((2 * m) // 3 AS VARCHAR)")} FROM mx
  UNION ALL SELECT {_H32E.format(sig="CAST(m AS VARCHAR)")} FROM mx
),
keyed AS (
  SELECT o_orderkey, o_totalprice,
         {_H32E.format(sig="CAST(o_orderkey AS VARCHAR)")} AS hk
  FROM orders
)
SELECT k.o_orderkey AS k, k.o_totalprice
FROM keyed k JOIN probes p ON k.hk = p.hk
"""


@register("x_bloom_index_sidecar", oracle=_POINT_BLOOM_SQL, tags=("S6", "P4"), doc="")
def x_bloom_index_sidecar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point lookup on a HASH-DISTRIBUTED key, planned from the TABLE-
    FORMAT-MANAGED bloom sidecar (VersionedTable.build_bloom_index — the Hudi
    bloom-index / Delta CREATE BLOOMFILTER INDEX idea). The probe column
    is an md5-derived 32-bit key uniformly spread across a random file
    layout, so every file's [min, max] spans ≈ the whole key space and
    zone maps keep everything — asserted in-query (n_zone == n_total
    before the index exists). After one column-pruned build scan
    (xxhash64 → k Kirsch-Mitzenmacher positions → two-phase
    groupBy(file, word).bit_or), the SAME read_pruned_in call consults
    the sidecar and opens only bloom-positive files — asserted strictly
    fewer. Differs from x_point_lookup_bloom (sources/skipping.py: a
    reader-owned stats layer over a plain directory) in that the index
    here is OWNED BY THE TABLE FORMAT: keyed to an immutable snapshot
    version, composed with the manifest's zone maps inside one
    read_pruned_in planner, and guarded against merge-on-read versions. Blooms have no false negatives (probe math mirrors build math
    bit-for-bit), so the result equals the plain filter the oracle runs;
    at 100 TB this is the difference between scanning every file of an
    id-keyed table for a point lookup and opening ~1."""
    import tempfile

    from ..sources.table_format import VersionedTable

    h32 = lambda c: F.conv(  # noqa: E731
        F.substring(F.md5(c.cast("string")), 1, 8), 16, 10
    ).cast("long")
    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    d = o.withColumn("hkey", h32(F.col("o_orderkey")))
    t = VersionedTable(spark, tempfile.mkdtemp(prefix="rdl_bloomidx_"))
    # deliberately NOT clustered on hkey: the adversarial-for-zone-maps
    # layout every id-keyed table has
    t.overwrite(d.repartition(12))

    mx = o.agg(F.max("o_orderkey")).first()[0]
    keys = [mx // 7, mx // 3, (2 * mx) // 3, mx]
    probes = [
        r["hk"]
        for r in spark.createDataFrame([(x,) for x in keys], "k long")
        .select(h32(F.col("k")).alias("hk"))
        .collect()
    ]
    _, n_zone, n_total = t.read_pruned_in("hkey", probes)
    assert n_zone == n_total, (n_zone, n_total)  # zone maps can't prune this
    t.build_bloom_index(["hkey"])
    df, n_bloom, _ = t.read_pruned_in("hkey", probes)
    assert n_bloom < n_zone, (n_bloom, n_zone)  # blooms can
    return df.select(F.col("o_orderkey").alias("k"), "o_totalprice")


@register("x_bloom_sidecar_chunked", oracle=_POINT_BLOOM_SQL, tags=("S6", "P4"), doc="")
def x_bloom_sidecar_chunked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CHUNKED bloom sidecar plane (r10): same point lookup as
    x_bloom_index_sidecar, but the index is built with a chunk_files cap
    far below the table's file count, so the sidecar head holds only
    key-range CHUNK DESCRIPTORS (no per-file word arrays) and the probe
    loads just the chunks covering zone-surviving files. In-query
    assertions pin the layout (head has `chunks`, not `cols`), that
    blooms still out-prune zone maps, and — via the oracle — that probes
    keep exact results with no false negatives across the chunk
    boundaries. At 10^6 files the monolithic sidecar costs ~1.2 GB of
    driver JSON per PLAN (measured 14.5 s); the chunked plane is ~19 ms
    flat (tools/bench_bloom_sidecar.py; SCALE.md round-10 table)."""
    import tempfile

    from ..sources.table_format import VersionedTable

    h32 = lambda c: F.conv(  # noqa: E731
        F.substring(F.md5(c.cast("string")), 1, 8), 16, 10
    ).cast("long")
    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    d = o.withColumn("hkey", h32(F.col("o_orderkey")))
    t = VersionedTable(spark, tempfile.mkdtemp(prefix="rdl_bloomchunk_"))
    t.overwrite(d.repartition(12))  # hash-spread: zone maps are useless

    mx = o.agg(F.max("o_orderkey")).first()[0]
    keys = [mx // 7, mx // 3, (2 * mx) // 3, mx]
    probes = [
        r["hk"]
        for r in spark.createDataFrame([(x,) for x in keys], "k long")
        .select(h32(F.col("k")).alias("hk"))
        .collect()
    ]
    _, n_zone, n_total = t.read_pruned_in("hkey", probes)
    assert n_zone == n_total, (n_zone, n_total)
    head = t.build_bloom_index(["hkey"], chunk_files=3)  # 12 files → 4 chunks
    assert "chunks" in head and "cols" not in head, sorted(head)
    assert len(head["chunks"]["hkey"]) == 4, head["chunks"]["hkey"]
    df, n_bloom, _ = t.read_pruned_in("hkey", probes)
    assert n_bloom < n_zone, (n_bloom, n_zone)
    return df.select(F.col("o_orderkey").alias("k"), "o_totalprice")


_ASOF_TS_SQL = f"""
WITH mx AS (SELECT MAX(o_orderkey) // 2 AS half FROM orders)
SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
       COUNT(*) AS n_orders,
       {sql_dsum("o_totalprice", scale=2)} AS revenue
FROM orders, mx
GROUP BY 1
"""


@register("x_time_travel_timestamp", oracle=_ASOF_TS_SQL, tags=("S6",), doc="")
def x_time_travel_timestamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel by TIMESTAMP (VersionedTable.read_asof — Delta's
    ``timestampAsOf`` / Iceberg's ``as-of-timestamp``): version
    resolution is a pure manifest read (greatest ``committed_at`` ≤ the
    asked instant; O(versions) driver work, no data access, no listing).
    The table takes three commits — lower half, append of the upper half
    (v2 = the full orders slice), then an overwrite that doubles prices —
    and the query reads AS OF v2's commit instant. In-query assertions
    pin the Delta contract: the resolved version is exactly 2, an
    instant between v2 and v3 still serves v2, "now" serves the head,
    and an instant before the first commit raises (no table state
    existed). The returned aggregate over the as-of read equals the
    oracle's aggregate over pristine orders — proving the time-travel
    read is byte-faithful to v2, untouched by the later overwrite."""
    import tempfile
    import time

    from ..sources.table_format import VersionedTable

    o = T(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderdate"
    )
    half = o.agg((F.max("o_orderkey") / 2).cast("long")).first()[0]
    t = VersionedTable(spark, tempfile.mkdtemp(prefix="rdl_asofts_"))
    t.overwrite(o.filter(F.col("o_orderkey") <= half))  # v1
    t.append(o.filter(F.col("o_orderkey") > half))  # v2 == full slice
    t.overwrite(  # v3: later state the as-of read must NOT see
        o.withColumn("o_totalprice", F.col("o_totalprice") * 2)
    )
    hist = t.history()
    ts2, ts3 = hist[1]["committed_at"], hist[2]["committed_at"]
    assert t.version_asof(ts2) == 2
    assert t.version_asof((ts2 + ts3) / 2) == 2  # between commits → v2
    assert t.version_asof(time.time()) == 3  # "now" → head
    try:
        t.version_asof(hist[0]["committed_at"] - 1.0)
        raise AssertionError("asof before first commit must raise")
    except ValueError:
        pass
    return (
        t.read_asof(ts2)
        .groupBy(F.year("o_orderdate").cast("long").alias("y"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", scale=2).alias("revenue"),
        )
    )


_INCR_APPEND_SQL = f"""
SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
       COUNT(*) AS n_orders,
       {sql_dsum("o_totalprice", scale=2)} AS revenue
FROM orders
GROUP BY 1
"""


@register("x_incremental_append", oracle=_INCR_APPEND_SQL, tags=("S6", "S3"), doc="")
def x_incremental_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental (AddFile-only) APPEND — the Delta/Iceberg append
    contract: committing a batch writes ONLY the batch and links the
    parent's data directories forward in the manifest, so an append to a
    100 TB table costs O(new data), never O(table). Asserted in-query
    three ways: the parent's files are byte-untouched (same listing and
    mtimes across the append), the new manifest carries the parent dir
    chain with composed per-file stats, and manifest range planning
    (read_pruned) still prunes across the multi-directory chain — a
    probe confined to the appended slice opens a strict subset of files.
    The returned aggregate over the final snapshot equals the oracle's
    over pristine orders, proving the chained read is the exact union.
    Maintenance composes: compaction folds a long chain back to
    right-sized files, after which vacuum reclaims the chain dirs
    (pinned by unit tests)."""
    import os
    import tempfile

    from ..sources.table_format import VersionedTable

    o = T(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderdate"
    )
    half = o.agg((F.max("o_orderkey") / 2).cast("long")).first()[0]
    t = VersionedTable(spark, tempfile.mkdtemp(prefix="rdl_incr_"))
    t.overwrite(o.filter(F.col("o_orderkey") <= half), cluster_by=["o_orderkey"])
    e1 = t._manifest(1)
    d1 = os.path.join(t.path, e1["data_dir"])
    listing_before = sorted(
        (f, os.path.getmtime(os.path.join(r, f)))
        for r, _d, fs in os.walk(d1)
        for f in fs
    )

    v2 = t.append(
        o.filter(F.col("o_orderkey") > half).repartitionByRange(
            4, F.col("o_orderkey")
        )
    )
    e2 = t._manifest(v2)
    assert e2.get("base_dirs") == [e1["data_dir"]], "append was not AddFile-only"
    listing_after = sorted(
        (f, os.path.getmtime(os.path.join(r, f)))
        for r, _d, fs in os.walk(d1)
        for f in fs
    )
    assert listing_after == listing_before, "append rewrote parent data"
    # stats composed (empty range buckets, if any, are never listed)
    assert len(e1["files"]) < len(e2["files"]) <= len(e1["files"]) + 4

    # manifest planning prunes ACROSS the chain: a probe inside the
    # appended slice never opens the base files
    mx = o.agg(F.max("o_orderkey")).first()[0]
    _, n_read, n_total = t.read_pruned("o_orderkey", (half + mx) // 2 + 1, mx)
    assert 0 < n_read < n_total, (n_read, n_total)

    return (
        t.read()
        .groupBy(F.year("o_orderdate").cast("long").alias("y"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", scale=2).alias("revenue"),
        )
    )


_COLMAP_SQL = """
SELECT o_orderpriority AS priority,
       COUNT(*) AS n_orders,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(25,2))), 2) AS DOUBLE) AS revenue
FROM orders
GROUP BY 1
"""


@register("x_column_mapping", oracle=_COLMAP_SQL, tags=("S6",), doc="")
def x_column_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only column RENAME and DROP (Delta column mapping): the
    commit writes one manifest entry that maps the on-disk physical name
    to a new logical name — zero files opened or rewritten at any table
    size, asserted in-query (the snapshot's data_dir is byte-identical
    across both ALTERs). Readers of the new version see the logical
    schema; TIME TRAVEL to pre-rename versions still serves the old
    names; stats-planned scans (read_pruned) resolve logical→physical
    through the mapping so manifest file-skipping keeps working after a
    rename — also asserted. The next materializing commit writes logical
    names physically and clears the mapping (pinned by unit tests). The
    oracle aggregates pristine orders under the ORIGINAL names; equality
    proves rename+drop changed naming only, never data."""
    import tempfile

    from ..sources.table_format import VersionedTable

    o = T(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice", "o_orderstatus"
    )
    t = VersionedTable(spark, tempfile.mkdtemp(prefix="rdl_colmap_"))
    t.overwrite(o, cluster_by=["o_orderkey"])
    d1 = t._manifest(1)["data_dir"]

    v2 = t.rename_column("o_totalprice", "price")
    v3 = t.drop_column("o_orderstatus")
    assert t._manifest(v2)["data_dir"] == d1 == t._manifest(v3)["data_dir"]
    assert t.read().columns == ["o_orderkey", "o_orderpriority", "price"]
    assert "o_totalprice" in t.read_version(1).columns  # time travel

    # manifest range planning still prunes THROUGH the mapping: the key
    # column is untouched, but the output schema is the logical one
    mx = o.agg(F.max("o_orderkey")).first()[0]
    df, n_read, n_total = t.read_pruned("o_orderkey", 1, mx // 4)
    assert 0 < n_read < n_total, (n_read, n_total)
    assert df.columns == ["o_orderkey", "o_orderpriority", "price"]

    return (
        t.read()
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("price", scale=2).alias("revenue"),
        )
    )


_SHALLOW_CLONE_SQL = f"""
SELECT c_mktsegment AS segment,
       COUNT(*) AS n_customers,
       {sql_dsum("c_acctbal", scale=2)} AS total_balance
FROM customer
GROUP BY 1
"""


@register("x_shallow_clone", oracle=_SHALLOW_CLONE_SQL, tags=("S6",), doc="")
def x_shallow_clone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHALLOW CLONE (Delta CLONE): a new, independently-writable table
    whose v1 manifest references the source's data files in place — zero
    bytes copied, O(1) at any table size (a 100 TB clone is one JSON
    write). Asserted in-query: the clone directory holds NO parquet; the
    source's files are byte-untouched; manifest stats rode along so
    zone-map planning (read_pruned) prunes on the clone without
    re-deriving anything. Divergence both ways is drilled live: a DELETE
    on the source after cloning leaves the clone pinned, and the clone
    runs dev-style mutations (delete) without the source seeing them —
    the staging/experimentation workflow shallow clones exist for. The
    returned aggregate runs on the CLONE after the source was mutilated;
    equality with the oracle over pristine customer proves full isolation.
    Self-containment path (compact → source vacuum-safe) is pinned by
    unit tests."""
    import os
    import tempfile

    from ..sources.table_format import VersionedTable

    c = T(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    src = VersionedTable(spark, tempfile.mkdtemp(prefix="rdl_clsrc_"))
    src.overwrite(c, cluster_by=["c_custkey"])

    dest = tempfile.mkdtemp(prefix="rdl_clone_")
    clone = src.clone_to(dest)
    n_parquet = sum(
        1 for _r, _d, fs in os.walk(dest) for f in fs if f.endswith(".parquet")
    )
    assert n_parquet == 0, "shallow clone copied data"

    # stats rode along: zone-map planning prunes on the clone itself
    mx = c.agg(F.max("c_custkey")).first()[0]
    _, n_read, n_total = clone.read_pruned("c_custkey", 1, max(1, mx // 4))
    assert 0 < n_read < n_total, (n_read, n_total)

    # divergence: mutilate the SOURCE after cloning; the clone is pinned
    src.delete(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
    assert src.read().count() < clone.read().count()

    # the clone writes freely without the source seeing it (dev sandbox)
    probe = clone.read().count()
    v2 = clone.append(
        c.filter(F.col("c_custkey") <= 5).withColumn(
            "c_custkey", F.col("c_custkey") + F.lit(10_000_000)
        )
    )
    assert clone.read_version(v2).count() > probe
    clone.restore(1)  # and time travel makes the sandbox disposable

    return (
        clone.read()
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum("c_acctbal", scale=2).alias("total_balance"),
        )
    )


_CHECKS_SQL = f"""
SELECT l_linestatus AS status,
       COUNT(*) AS n_items,
       {sql_dsum("l_extendedprice", scale=2)} AS gross
FROM lineitem
WHERE l_quantity > 0 AND l_discount BETWEEN 0 AND 0.1
GROUP BY 1
"""


@register("x_check_constraints", oracle=_CHECKS_SQL, tags=("S6",), doc="")
def x_check_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persistent CHECK constraints (Delta ALTER TABLE ADD CONSTRAINT):
    the constraint is TABLE metadata — a metadata-only commit records it
    in the manifest (zero files rewritten, asserted in-query), every
    later commit carries it, and each commit's WRITTEN rows are gated
    against it before the manifest publishes — O(new rows) on the
    incremental append path, so the gate costs the batch, not the 100 TB
    table. Drilled live: adding a check the existing snapshot violates
    is rejected; a violating append aborts with ConstraintViolation and
    publishes nothing (version and row count unchanged); valid appends
    flow through. The returned aggregate over the final table equals the
    oracle over the pristine rows that satisfy the constraint — the
    engine-level proof that only constraint-clean data ever committed."""
    import tempfile

    from ..sources.constraints import ConstraintViolation
    from ..sources.table_format import VersionedTable

    li = T(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linestatus", "l_quantity", "l_discount", "l_extendedprice"
    )
    clean = li.filter((F.col("l_quantity") > 0) & F.col("l_discount").between(0, 0.1))
    dirty = li.filter(~((F.col("l_quantity") > 0) & F.col("l_discount").between(0, 0.1)))

    half = clean.agg((F.max("l_orderkey") / 2).cast("long")).first()[0]
    t = VersionedTable(spark, tempfile.mkdtemp(prefix="rdl_chk_"))
    t.overwrite(clean.filter(F.col("l_orderkey") <= half))
    v2 = t.add_check("qty_positive", "l_quantity > 0")
    v3 = t.add_check("discount_band", "l_discount BETWEEN 0 AND 0.1")
    # metadata-only: both ALTERs point at v1's exact data
    assert t._manifest(v2)["data_dir"] == t._manifest(v3)["data_dir"] == t._manifest(1)["data_dir"]

    # a check the EXISTING data violates must be rejected (Delta semantics)
    try:
        t.add_check("impossible", "l_quantity > 1000000")
        raise AssertionError("add_check accepted a violated constraint")
    except ConstraintViolation:
        pass

    # a violating batch aborts before publishing ANYTHING
    n_before, v_before = t.read().count(), t.current_version()
    if dirty.take(1):  # sf0.001 slices can be all-clean
        try:
            t.append(dirty)
            raise AssertionError("violating append committed")
        except ConstraintViolation:
            pass
    assert (t.read().count(), t.current_version()) == (n_before, v_before)

    # valid data flows; the constraint rides the incremental commit
    v4 = t.append(clean.filter(F.col("l_orderkey") > half))
    assert set(t._manifest(v4)["checks"]) == {"qty_positive", "discount_band"}

    return (
        t.read()
        .groupBy(F.col("l_linestatus").alias("status"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum("l_extendedprice", scale=2).alias("gross"),
        )
    )


_IDENTITY_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(1 AS BIGINT) AS min_sk,
       CAST(COUNT(*) AS BIGINT) AS max_sk,
       CAST(COUNT(*) AS BIGINT) AS n_distinct_sk,
       CAST(COUNT(*) * (COUNT(*) + 1) / 2 AS BIGINT) AS sum_sk
FROM orders
"""


@register("x_identity_column", oracle=_IDENTITY_SQL, tags=("S6",), doc="")
def x_identity_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IDENTITY column (Delta GENERATED ALWAYS AS IDENTITY): the table
    mints dense int64 surrogate keys at commit time from a manifest high
    watermark — batches must not carry the column. Assignment is
    DISTRIBUTED: one count-per-partition pass derives partition offsets,
    an Arrow mapInPandas stamps ranges — no global sort, no
    single-partition window, no driver loop; at 100 TB the assignment
    costs one narrow pass over the batch. Concurrency-safe by the same
    CAS the commits use: a lost race re-reads the winner's watermark and
    re-assigns (duplicate-mint impossible — pinned by a race-injection
    unit test). Drilled here across two appends: the second continues
    exactly where the first stopped. The oracle states the dense-range
    invariants (min=1, max=n, distinct=n, sum=n(n+1)/2) — Gauss closes
    the contract: the sum matches ONLY if every id in 1..n appears
    exactly once, independent of which row got which id."""
    import tempfile

    from ..sources.table_format import VersionedTable

    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    half = o.agg((F.max("o_orderkey") / 2).cast("long")).first()[0]
    t = VersionedTable(spark, tempfile.mkdtemp(prefix="rdl_ident_"))
    v1 = t.append(o.filter(F.col("o_orderkey") <= half), identity="sk")
    v2 = t.append(o.filter(F.col("o_orderkey") > half), identity="sk")
    wm1 = t._manifest(v1)["identity"]["sk"]
    wm2 = t._manifest(v2)["identity"]["sk"]
    assert wm2 > wm1 > 1 and t._manifest(v2).get("base_dirs"), (wm1, wm2)

    return t.read().agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("sk").alias("min_sk"),
        F.max("sk").alias("max_sk"),
        F.countDistinct("sk").alias("n_distinct_sk"),
        F.sum("sk").alias("sum_sk"),
    )


_HIDDEN_PART_SQL = f"""
SELECT o_orderpriority AS priority,
       COUNT(*) AS n_orders,
       {sql_dsum("o_totalprice", scale=2)} AS revenue
FROM orders
WHERE o_orderdate BETWEEN DATE '1996-02-01' AND DATE '1996-10-31'
GROUP BY 1
"""


@register("x_hidden_partitioning", oracle=_HIDDEN_PART_SQL, tags=("S6", "P4", "S3"), doc="")
def x_hidden_partitioning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HIDDEN partitioning (Iceberg's defining feature vs hive tables):
    the table declares ``month(o_orderdate)`` and the ENGINE derives,
    writes, and hides the partition column — users keep filtering on
    o_orderdate, and scan planning maps the date range into partition
    bounds through the same transform (pure Python date math, zero Spark
    jobs), opening only the matching hive directories. This kills the
    classic hive failure where a filter on the source column reads the
    whole 100 TB table because the user didn't ALSO filter the derived
    date-string column. Asserted in-query: the derived column never
    appears in the read schema; a 9-month probe over a multi-year table
    opens exactly the 9 matching partitions of the total; an
    out-of-domain probe opens zero. The returned aggregate over the
    pruned scan equals the oracle's over pristine orders with a plain
    date predicate — planning changed I/O, never results."""
    import datetime as dt
    import tempfile

    from ..sources.table_format import VersionedTable

    o = T(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority", "o_totalprice"
    )
    t = VersionedTable(spark, tempfile.mkdtemp(prefix="rdl_hidden_"))
    t.overwrite(o, hidden_partition=("month", "o_orderdate"))
    assert t.read().columns == o.columns  # derived column stays hidden

    lo, hi = dt.date(1996, 2, 1), dt.date(1996, 10, 31)
    pruned, n_read, n_total = t.read_hidden(lo, hi)
    assert n_read == 9 and n_total > 12 * 4, (n_read, n_total)
    _, n0, _ = t.read_hidden(dt.date(2090, 1, 1), dt.date(2090, 6, 1))
    assert n0 == 0  # out-of-domain: zero partitions, zero files

    return pruned.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice", scale=2).alias("revenue"),
    )


@register(
    "x_incremental_hidden_prune",
    oracle=_HIDDEN_PART_SQL,
    tags=("S6", "P4", "S3"),
    doc="",
)
def x_incremental_hidden_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hidden partitioning × INCREMENTAL appends (r10): a hidden-
    partitioned table takes AddFile appends — each batch writes its OWN
    dir with the parent's derived hive layout and the manifest chains
    base_dirs forward, so an hourly append to a 100 TB hidden table
    costs the hour, not a rewrite (before r10 it materialized the whole
    snapshot). Scan planning then prunes hive dirs PER CHAINED
    DIRECTORY — before r10 any base_dirs chain silently fell back to an
    unpruned full read (-1/-1). Asserted in-query: the append commit
    carries base_dirs (AddFile, not a rewrite); the 9-month probe keeps
    exactly 9 subdirs per chained dir with REAL counts; results equal
    the oracle's plain date predicate over pristine orders."""
    import datetime as dt
    import tempfile

    from ..sources.table_format import VersionedTable

    o = T(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority", "o_totalprice"
    )
    half = o.agg((F.max("o_orderkey") / 2).cast("long")).first()[0]
    t = VersionedTable(spark, tempfile.mkdtemp(prefix="rdl_hidinc_"))
    t.overwrite(
        o.filter(F.col("o_orderkey") <= half),
        hidden_partition=("month", "o_orderdate"),
    )
    v2 = t.append(o.filter(F.col("o_orderkey") > half))
    m2 = t._manifest(v2)
    assert m2.get("base_dirs") and m2.get("hidden_partition"), m2.keys()

    lo, hi = dt.date(1996, 2, 1), dt.date(1996, 10, 31)
    pruned, n_read, n_total = t.read_hidden(lo, hi)
    # REAL per-dir counts (no -1/-1 fallback): ≤9 month-dirs per chained
    # dir survive, out of every month-dir both dirs hold
    assert 0 < n_read <= 18 and n_total > n_read, (n_read, n_total)

    return pruned.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice", scale=2).alias("revenue"),
    )


_JOIN_HINTS_SQL = f"""
SELECT n_name AS nation,
       COUNT(*) AS n_customers,
       {sql_dsum("c_acctbal", scale=2)} AS total_balance
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY 1
"""


@register("x_join_hints", oracle=_JOIN_HINTS_SQL, tags=("J1", "J2"), doc="")
def x_join_hints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-STRATEGY hints (the optimizer override surface a tuning
    engineer actually uses): the SAME logical join is planned three ways
    — BROADCAST (dim ships to every task: the 100 TB default for small
    dims), SHUFFLE_HASH (both sides exchange on the key, build the
    smaller hash map: wins over sort-merge when one side is modest and
    sorting is the cost), and MERGE (sort-merge: the robust default when
    both sides are huge and neither fits a hash map in memory). Each
    executed plan is asserted to materialize the HINTED operator, and
    all three variants must agree row-for-row — strategy changes cost,
    never semantics. The returned aggregate (broadcast variant) matches
    the hint-free oracle."""
    c = T(spark, sf_dir, "customer").select("c_custkey", "c_nationkey", "c_acctbal")
    n = T(spark, sf_dir, "nation").select("n_nationkey", "n_name")

    def agg(joined: DataFrame) -> DataFrame:
        return joined.groupBy(F.col("n_name").alias("nation")).agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum("c_acctbal", scale=2).alias("total_balance"),
        )

    wanted = {
        "broadcast": "BroadcastHashJoin",
        "shuffle_hash": "ShuffledHashJoin",
        "merge": "SortMergeJoin",
    }
    out = {}
    for hint, op in wanted.items():
        joined = c.join(
            n.hint(hint), c.c_nationkey == F.col("n_nationkey")
        )
        result = agg(joined)
        result.collect()  # finalize the adaptive plan before asserting
        plan = (
            result._jdf.queryExecution()
            .executedPlan()
            .toString()
            .split("== Initial Plan ==")[0]
        )
        assert op in plan, f"{hint} hint did not materialize {op}"
        out[hint] = result

    # strategy never changes semantics: all three agree row-for-row
    assert out["broadcast"].exceptAll(out["shuffle_hash"]).isEmpty()
    assert out["shuffle_hash"].exceptAll(out["merge"]).isEmpty()
    assert out["merge"].exceptAll(out["broadcast"]).isEmpty()
    return out["broadcast"]


_METADATA_COL_SQL = f"""
SELECT CAST(4 AS BIGINT) AS n_files,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       {sql_dsum("c_acctbal", scale=2)} AS total_balance
FROM customer
"""


@register("f9_metadata_column", oracle=_METADATA_COL_SQL, tags=("S4", "F7"), doc="")
def f9_metadata_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hidden ``_metadata`` file column (Spark's built-in row-level
    file lineage — what incremental frameworks and debugging sessions
    key on): every parquet row can name its ``file_path``, ``file_size``
    and ``row_index`` with ZERO extra I/O (constant per file / position
    counter per batch, materialized only when selected — absent from
    ReadSchema otherwise). Drilled on a 4-file table written in-query:
    ``row_index`` is asserted dense 0..n_f-1 within every file (count,
    min, max, and Gauss sum per file — the per-file analogue of the
    identity-column contract), and the returned (n_files, n_rows,
    balance) row matches the oracle over pristine customer — lineage
    columns never perturb data ones."""
    import tempfile

    c = T(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    d = tempfile.mkdtemp(prefix="rdl_meta_")
    c.repartition(4).write.mode("overwrite").parquet(d)

    back = spark.read.parquet(d).select(
        "c_custkey",
        "c_acctbal",
        F.col("_metadata.file_path").alias("fp"),
        F.col("_metadata.row_index").alias("ri"),
    )
    per_file = back.groupBy("fp").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("ri").alias("lo"),
        F.max("ri").alias("hi"),
        F.sum("ri").alias("s"),
    ).collect()
    assert len(per_file) == 4
    for r in per_file:  # dense 0..n-1 within each file
        assert (r.lo, r.hi, r.s) == (0, r.n - 1, r.n * (r.n - 1) // 2), r

    return back.agg(
        F.countDistinct("fp").alias("n_files"),
        F.count(F.lit(1)).alias("n_rows"),
        dsum("c_acctbal", scale=2).alias("total_balance"),
    )


_ZORDER_MANIFEST_SQL = f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
       {sql_dsum("o_totalprice", scale=2)} AS revenue,
       CAST(MIN(o_orderkey) AS BIGINT) AS first_key
FROM orders
WHERE o_custkey BETWEEN 100 AND 500
"""


@register("x_zorder_manifest", oracle=_ZORDER_MANIFEST_SQL, tags=("S6", "P4"), doc="")
def x_zorder_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMIZE ZORDER integrated with MANIFEST scan planning (the Delta
    `OPTIMIZE ... ZORDER BY` + data-skipping composition): orders are
    laid out along the Z-curve of (o_orderkey, o_custkey) via
    `operators/zorder.py` and committed through VersionedTable, whose
    manifest records per-file [min,max] for BOTH dimensions (the same
    footer walk every commit pays). The payoff over linear clustering:
    `read_pruned` then skips files from the MANIFEST ALONE — zero
    listing, zero footer reads at plan time — on EITHER dimension,
    asserted in-query for both a primary-key range and a secondary-key
    range. One copy of 100 TB serves selective scans on k dimensions.
    The returned aggregate runs on the secondary-dimension pruned scan
    and matches the hint-free oracle."""
    import tempfile

    from ..operators.zorder import z_order_by
    from ..sources.table_format import VersionedTable

    o = T(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    t = VersionedTable(spark, tempfile.mkdtemp(prefix="rdl_zm_"))
    t.overwrite(z_order_by(o, ["o_orderkey", "o_custkey"], n_partitions=16))

    mx_k = o.agg(F.max("o_orderkey")).first()[0]
    _, n1, total1 = t.read_pruned("o_orderkey", 1, mx_k // 8)
    assert 0 < n1 < total1, (n1, total1)  # primary dim prunes

    pruned, n2, total2 = t.read_pruned("o_custkey", 100, 500)
    assert 0 < n2 < total2, (n2, total2)  # secondary dim prunes TOO

    return pruned.agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice", scale=2).alias("revenue"),
        F.min("o_orderkey").alias("first_key"),
    )


_CHUNKED_MANIFEST_SQL = f"""
SELECT CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS VARCHAR) AS month,
       COUNT(*) AS n_orders, {sql_dsum("o_totalprice", scale=2)} AS revenue
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate <= TIMESTAMP '1996-06-30'
GROUP BY 1
"""


@register("x_chunked_manifest", oracle=_CHUNKED_MANIFEST_SQL, tags=("S4", "S6", "P4"), doc="")
def x_chunked_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHUNKED manifests (Iceberg's manifest-list design, r9): above a
    file-count threshold the per-file stats split into chunk files and
    the version JSON carries only per-chunk descriptors with FOLDED
    column bounds. Planning prunes at chunk level first — a chunk whose
    folded bounds miss the predicate is skipped with ZERO I/O — so plan
    cost is O(chunks + files-in-overlapping-chunks), not O(files): at
    10⁶ files the monolithic layout costs a 112 MB JSON parse per plan
    (4.6 s measured, tools/bench_manifest.py), the chunked one 5 ms.
    The in-query audit pins all three behaviors on a 16-file / 4-chunk
    table: (a) the version JSON holds descriptors, not file stats;
    (b) a half-year range loads a strict subset of chunks AND a strict
    subset of files; (c) stats_agg answers from descriptors with zero
    chunk reads. The oracle is the plain relational answer over the same
    range — hash-equality proves chunk-level pruning loses nothing."""
    import datetime
    import tempfile

    from ..sources.table_format import VersionedTable

    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice", "o_orderdate")
    t = VersionedTable(
        spark, tempfile.mkdtemp(prefix="rdl_chunkman_"), manifest_chunk_files=4
    )
    t.overwrite(o, cluster_by=["o_orderdate"], cluster_files=16)

    m = t._manifest(1)
    assert m.get("files") is None and len(m["manifest_list"]) == 4
    assert sum(c["n_files"] for c in m["manifest_list"]) == 16

    loads: list[str] = []
    orig = t._load_chunk
    t._load_chunk = lambda name: (loads.append(name) or orig(name))

    lo = datetime.datetime(1996, 1, 1)
    hi = datetime.datetime(1996, 6, 30)
    df, n_read, n_total = t.read_pruned("o_orderdate", lo, hi)
    assert n_total == 16 and 0 < n_read < n_total, (n_read, n_total)
    assert 0 < len(set(loads)) < 4, loads  # disjoint chunks: ZERO I/O

    loads.clear()
    sa = t.stats_agg("o_orderkey")
    assert sa is not None and loads == []  # descriptors alone answered it
    assert sa["n_rows"] == m["n_rows"]

    return df.groupBy(
        F.date_trunc("month", "o_orderdate").cast("date").cast("string").alias("month")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice", scale=2).alias("revenue"),
    )


_BITMAP_DISTINCT_SQL = """
SELECT event_type,
       CAST(CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE) AS VARCHAR) AS week,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events
GROUP BY 1, 2
"""


@register("x_bitmap_distinct", oracle=_BITMAP_DISTINCT_SQL, tags=("A2", "A7", "F3"), doc="")
def x_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT mergeable COUNT DISTINCT via integer BITMAPS (the
    Druid/ClickHouse bitmap-index trick, reduced to pure JVM column
    math): each user_id maps to (word = id DIV 64, bit = id % 64); a
    group's user set is the bit_or of its 64-bit words and its exact
    distinct count is Σ bit_count(word). Unlike COUNT(DISTINCT) —
    which is NOT additive and must re-shuffle raw rows for every
    grouping level — bitmap partials MERGE: the weekly counts here are
    derived from per-(type, day, word) partials by a second bit_or,
    never touching raw events again. At 100 TB that's the difference
    between one scan feeding every rollup level (day→week→month→all)
    and one full re-aggregation per level; partials are
    O(groups × id-space/64) words, stored like any other additive mart.
    HLL (x_hll_sketch_union) is this trade with bounded error and
    fixed-size sketches for unbounded id spaces; bitmaps are EXACT while
    ids are dense — exactly the surrogate-key case identity columns
    produce. The oracle recomputes COUNT(DISTINCT) from raw rows:
    hash-equality proves merge-correctness of the partials."""
    from ..catalog import load_table

    e = load_table(spark, sf_dir, "events").select("event_type", "ts", "user_id")
    words = e.select(
        "event_type",
        F.date_trunc("day", "ts").alias("day"),
        (F.col("user_id") / 64).cast("long").alias("word_idx"),
        F.expr("shiftleft(1L, CAST(user_id % 64 AS INT))").alias("bit"),
    )
    # level 1: per-(type, DAY, word) partials — the stored mart
    daily = words.groupBy("event_type", "day", "word_idx").agg(
        F.bit_or("bit").alias("word")
    )
    # level 2: weekly = bit_or MERGE of daily partials (no raw re-scan)
    weekly = daily.groupBy(
        "event_type",
        F.date_trunc("week", "day").cast("date").cast("string").alias("week"),
        "word_idx",
    ).agg(F.bit_or("word").alias("word"))
    return weekly.groupBy("event_type", "week").agg(
        F.sum(F.bit_count("word")).cast("long").alias("n_users")
    )


_POSITION_DELETE_SQL = f"""
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       {sql_dsum("l_quantity", scale=2)} AS qty,
       {sql_dsum("l_extendedprice", scale=2)} AS price
FROM lineitem
WHERE NOT (l_quantity <= 10) AND NOT (l_orderkey % 7 = 0)
GROUP BY l_returnflag
"""


@register("x_position_deletes", oracle=_POSITION_DELETE_SQL, tags=("S7", "S6", "J6"), doc="")
def x_position_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POSITION deletes (Iceberg position delete files / Delta deletion
    vectors proper, VersionedTable.delete_mor_pos): each DELETE commits
    only a tombstone file of (file, row_index) pairs — the rows'
    PHYSICAL identity from Spark's parquet `_metadata` column — in
    O(deleted), and readers resolve base ANTI-JOIN positions. The
    contract difference from the keyed `delete_mor`: NO unique key
    required, so merge-on-read deletes work on exactly the tables real
    pipelines delete from — event logs, raw crawls, line items — where
    no row identity exists. Two stacked deletes here prove tombstones
    compose (and the second never resurrects the first's rows); the
    oracle recomputes the surviving aggregate relationally from the raw
    table, so the hash pins both the anti-join and the row accounting.
    At 100 TB: a delete touches O(matched) rows of I/O, never the
    table; compaction folds tombstones back in when read amplification
    warrants (x_merge_on_read_delete shows the keyed flavor; the two
    never mix on one chain by guard)."""
    import tempfile

    from ..sources.table_format import VersionedTable

    li = T(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_quantity", "l_extendedprice"
    )
    t = VersionedTable(spark, tempfile.mkdtemp(prefix="rdl_posdel_"))
    t.overwrite(li)
    v2 = t.delete_mor_pos(F.col("l_quantity") <= 10)
    v3 = t.delete_mor_pos("l_orderkey % 7 = 0")
    assert (v2, v3) == (2, 3)
    e = t._manifest(3)
    assert len(e["pos_dv_dirs"]) == 2 and "dv_keys" not in e
    # O(deleted): the data files are untouched across both deletes
    assert e["data_dir"] == t._manifest(1)["data_dir"]
    return t.read().groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum("l_quantity", scale=2).alias("qty"),
        dsum("l_extendedprice", scale=2).alias("price"),
    )


_INCR_OPTIMIZE_SQL = f"""
WITH t AS (
  SELECT o_orderkey, o_totalprice, o_orderdate FROM orders
  UNION ALL
  SELECT o_orderkey + 100000000, o_totalprice, o_orderdate + INTERVAL 1 HOUR
  FROM orders
  WHERE o_orderdate < TIMESTAMP '1995-07-01'
)
SELECT CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS VARCHAR) AS month,
       COUNT(*) AS n_orders, {sql_dsum("o_totalprice", scale=2)} AS revenue
FROM t
WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate <= TIMESTAMP '1997-06-30'
GROUP BY 1
"""


@register("x_incremental_optimize", oracle=_INCR_OPTIMIZE_SQL, tags=("S6", "S4", "P4"), doc="")
def x_incremental_optimize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL OPTIMIZE (Databricks OPTIMIZE / liquid-clustering
    shape, VersionedTable.optimize_incremental): after appends disturb a
    clustered layout, rewrite ONLY the files whose key ranges overlap —
    planned purely from the manifest's per-file bounds, zero data reads
    for untouched files — and carry every still-clustered file by
    REFERENCE in a FILE-GRANULAR manifest. A full compact() is O(table)
    every run; at 100 TB with hourly appends the overlap set is the last
    few appends, so maintenance cost tracks ingest, not table size. The
    in-query audit pins: some files carried (not an O(table) rewrite),
    rewritten count bounded, content row-count preserved, and planned
    range pruning working on the optimized snapshot. The fixture appends
    a first-half-1995 slice (shifted +1 h so the clone is distinguishable)
    into a date-clustered base — the appended file overlaps ONLY the
    early-date base files; the oracle recomputes a 1997 range aggregate
    relationally over base+append, so the hash proves the optimize
    rewrote and carried without losing or duplicating a row."""
    import datetime
    import tempfile

    from ..sources.table_format import VersionedTable

    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice", "o_orderdate")
    t = VersionedTable(spark, tempfile.mkdtemp(prefix="rdl_incropt_"))
    t.overwrite(o, cluster_by=["o_orderdate"], cluster_files=16)
    tail = o.filter(F.col("o_orderdate") < "1995-07-01").select(
        (F.col("o_orderkey") + 100_000_000).alias("o_orderkey"),
        "o_totalprice",
        (F.col("o_orderdate") + F.expr("INTERVAL 1 HOUR")).alias("o_orderdate"),
    )
    t.append(tail)
    n_before = t._manifest(t.current_version())["n_rows"]

    res = t.optimize_incremental("o_orderdate")
    e = t._manifest(res["version"])
    assert e["file_granular"] is True and e["n_rows"] == n_before
    # the whole point: NOT an O(table) rewrite — clustered files carried
    assert res["carried"] > 0 and res["rewritten"] < res["carried"] + res["rewritten"]
    assert res["rewritten"] > 0

    lo = datetime.datetime(1997, 1, 1)
    hi = datetime.datetime(1997, 6, 30)
    df, n_read, n_total = t.read_pruned("o_orderdate", lo, hi)
    assert 0 < n_read < n_total  # planned pruning works on the new layout
    return df.groupBy(
        F.date_trunc("month", "o_orderdate").cast("date").cast("string").alias("month")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice", scale=2).alias("revenue"),
    )


_UPDATE_MOR_SQL = f"""
WITH t AS (
  SELECT l_returnflag,
         CASE WHEN l_quantity <= 5 THEN l_quantity * 10 ELSE l_quantity END
           AS l_quantity,
         CASE WHEN l_discount > 0.05 THEN 0.05 ELSE l_discount END AS l_discount,
         l_extendedprice
  FROM lineitem)
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       {sql_dsum("l_quantity", scale=2)} AS qty,
       {sql_dsum("l_discount", scale=2)} AS disc,
       {sql_dsum("l_extendedprice", scale=2)} AS price
FROM t GROUP BY l_returnflag
"""


@register("x_update_mor", oracle=_UPDATE_MOR_SQL, tags=("S7", "S6", "J6"), doc="")
def x_update_mor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read UPDATE (Delta's deletion-vector UPDATE,
    VersionedTable.update_mor): one commit position-tombstones the
    matched rows AND appends their updated images — O(changed) I/O,
    every pre-existing data file untouched. A copy-on-write UPDATE
    rewrites every file containing a match; at 100 TB a 0.1%-selective
    correction pass touches ~0.1% of the table here versus most of it
    there. Two stacked updates (a quantity rescale on small lots, then a
    discount cap) prove the tombstone+image chains compose and the
    second update reads the FIRST's post-images; the in-query audit pins
    the O(changed) contract (update dirs hold exactly the matched
    counts, the v1 data dir rides every manifest untouched) and row
    preservation. The oracle recomputes both updates relationally from
    the raw table, so the hash check proves no row was lost, duplicated,
    or double-updated across the merge-on-read resolution."""
    import os
    import tempfile

    from ..sources.table_format import VersionedTable, _parquet_num_rows

    li = T(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_quantity", "l_discount", "l_extendedprice"
    )
    t = VersionedTable(spark, tempfile.mkdtemp(prefix="rdl_updmor_"))
    t.overwrite(li)
    p_dir = t._manifest(1)["data_dir"]
    n_small = li.filter("l_quantity <= 5").count()

    t.update_mor("l_quantity <= 5", {"l_quantity": "l_quantity * 10"})
    t.update_mor("l_discount > 0.05", {"l_discount": "CAST(0.05 AS DOUBLE)"})
    e2, e3 = t._manifest(2), t._manifest(3)
    # O(changed): update dirs hold exactly the matched rows; the original
    # data directory is untouched and carried by every manifest
    assert _parquet_num_rows(os.path.join(t.path, e2["data_dir"])) == n_small
    assert e2["n_updated"] == n_small and e3["n_rows"] == e2["n_rows"]
    assert p_dir in e2["base_dirs"] and p_dir in e3["base_dirs"]

    return t.read().groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum("l_quantity", scale=2).alias("qty"),
        dsum("l_discount", scale=2).alias("disc"),
        dsum("l_extendedprice", scale=2).alias("price"),
    )


_UPDATE_MOR_PART_SQL = f"""
WITH t AS (
  SELECT o_orderpriority,
         CASE WHEN o_orderstatus = 'F' THEN o_totalprice * 1.1
              ELSE o_totalprice END AS o_totalprice,
         o_orderdate
  FROM orders)
SELECT o_orderpriority AS priority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       {sql_dsum("o_totalprice", scale=4)} AS revenue
FROM t
WHERE o_orderdate BETWEEN DATE '1996-02-01' AND DATE '1996-10-31'
GROUP BY 1
"""


@register(
    "x_update_mor_partitioned",
    oracle=_UPDATE_MOR_PART_SQL,
    tags=("S7", "S6", "P4"),
    doc="",
)
def x_update_mor_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read UPDATE over a HIDDEN-partitioned layout (r10
    inherit_layout — the r9 compact-first guard is gone): the update
    directory re-derives the parent's month(o_orderdate) transform and
    writes the same hive layout, the manifest keeps declaring the spec,
    and the commit stays O(changed) while every pre-existing hive
    directory rides untouched. A real lakehouse updates partitioned
    tables in place — at 100 TB the alternative was a full-table compact
    before every correction pass. In-query audit: the manifest carries
    both hidden_partition and partition_by across the update; the update
    dir holds hive subdirs on disk; read_hidden keeps serving exact rows
    (anti-join fallback while tombstones pend). The oracle recomputes the
    update relationally over a pruned month range, so the hash proves
    MOR resolution composes with the layout — no row lost, duplicated,
    or served from a stale image."""
    import datetime as dt
    import os
    import tempfile

    from ..sources.table_format import VersionedTable

    o = T(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderpriority",
        "o_totalprice", "o_orderdate",
    )
    t = VersionedTable(spark, tempfile.mkdtemp(prefix="rdl_updmorp_"))
    t.overwrite(o, hidden_partition=("month", "o_orderdate"))
    v2 = t.update_mor(
        "o_orderstatus = 'F'", {"o_totalprice": "o_totalprice * 1.1"}
    )
    e2 = t._manifest(v2)
    assert e2["hidden_partition"]["transform"] == "month"
    assert e2["partition_by"] == [e2["hidden_partition"]["name"]]
    upd = os.path.join(t.path, e2["data_dir"])
    assert any(s.startswith("__p_") for s in os.listdir(upd)), os.listdir(upd)

    lo, hi = dt.date(1996, 2, 1), dt.date(1996, 10, 31)
    pruned, n_read, n_total = t.read_hidden(lo, hi)
    assert (n_read, n_total) == (-1, -1)  # pending tombstones: exact fallback
    # scale=4 guard digits (NOT 2): the updated rows carry a 3-decimal
    # `* 1.1` product, and at scale=2 Spark (HALF_UP on the double's
    # shortest repr: 271677.505 -> .51) and DuckDB (round of the binary
    # value: -> .50) disagree on the .xx5 cast boundary — r10's one red
    # driver row. At 4 decimals both engines represent the product
    # exactly, so the cast is value-identical.
    return pruned.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice", scale=4).alias("revenue"),
    )


_MOR_OVER_OPT_SQL = f"""
WITH t AS (
  SELECT o_orderkey, o_orderpriority,
         CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + 100000.0
              ELSE o_totalprice END AS o_totalprice
  FROM orders
  WHERE o_orderkey % 7 != 0)
SELECT o_orderpriority AS priority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       {sql_dsum("o_totalprice", scale=2)} AS revenue
FROM t GROUP BY 1
"""


@register("x_mor_over_optimize", oracle=_MOR_OVER_OPT_SQL, tags=("S7", "S6"), doc="")
def x_mor_over_optimize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read verbs OVER an incremental-optimize snapshot (r10 —
    file-granular manifests as the default read path): a clustered table
    takes an overlapping append, optimize_incremental rewrites just the
    overlap into a FILE-GRANULAR snapshot, and then delete_mor_pos and
    update_mor land directly on it — position tombstones + image files
    resolving against the EXPLICIT file list, never directory reads that
    would resurrect the superseded originals. Before r10 both verbs
    raised compact-first, forcing an O(table) rewrite between every
    optimize and every correction pass. In-query audit: the optimize
    snapshot and both MOR commits all carry file_granular; commits stay
    O(changed). Oracle recomputes delete+update relationally."""
    import tempfile

    from ..sources.table_format import VersionedTable

    o = T(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    t = VersionedTable(spark, tempfile.mkdtemp(prefix="rdl_moropt_"))
    # the append spans the WHOLE key range (every %3 key), so it overlaps
    # every clustered file and the optimize genuinely rewrites
    t.overwrite(
        o.filter(F.col("o_orderkey") % 3 != 0), cluster_by=["o_orderkey"],
        cluster_files=6,
    )
    t.append(o.filter(F.col("o_orderkey") % 3 == 0))
    res = t.optimize_incremental("o_orderkey", rows_per_file=100_000)
    assert t._manifest(res["version"])["file_granular"] is True

    v_del = t.delete_mor_pos("o_orderkey % 7 = 0")
    v_upd = t.update_mor(
        "o_orderkey % 10 = 0", {"o_totalprice": "o_totalprice + 100000.0"}
    )
    assert t._manifest(v_del)["file_granular"] is True
    assert t._manifest(v_upd)["file_granular"] is True

    return t.read().groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice", scale=2).alias("revenue"),
    )


@register("x_bloom_over_optimize", oracle=_POINT_BLOOM_SQL, tags=("S6", "P4"), doc="")
def x_bloom_over_optimize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom sidecar OVER an incremental-optimize snapshot (r10): the
    build scans the snapshot's EXPLICIT file list — the optimize dirs
    also hold superseded originals whose words would poison the index
    with phantom positives (worse: a probe could keep only a superseded
    file). Before r10 the build raised compact-first. The table clusters
    on o_totalprice so optimize finds overlap, while the probe key is the
    hash-spread hkey zone maps can't prune — asserted in-query (zone keep
    == total, bloom keep < total, on the file-granular snapshot). Oracle
    = exact point lookup."""
    import tempfile

    from ..sources.table_format import VersionedTable

    h32 = lambda c: F.conv(  # noqa: E731
        F.substring(F.md5(c.cast("string")), 1, 8), 16, 10
    ).cast("long")
    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    d = o.withColumn("hkey", h32(F.col("o_orderkey")))
    n = o.count()
    t = VersionedTable(spark, tempfile.mkdtemp(prefix="rdl_bloomopt_"))
    t.overwrite(
        d.filter(F.col("o_orderkey") % 3 != 0), cluster_by=["o_totalprice"],
        cluster_files=6,
    )
    t.append(d.filter(F.col("o_orderkey") % 3 == 0))  # overlaps every file
    # scale-adaptive file sizing: the optimized snapshot keeps ~8 files at
    # ANY sf so the zone-vs-bloom pruning contrast below stays meaningful
    res = t.optimize_incremental("o_totalprice", rows_per_file=max(n // 8, 50))
    assert t._manifest(res["version"])["file_granular"] is True

    mx = o.agg(F.max("o_orderkey")).first()[0]
    keys = [mx // 7, mx // 3, (2 * mx) // 3, mx]
    probes = [
        r["hk"]
        for r in spark.createDataFrame([(x,) for x in keys], "k long")
        .select(h32(F.col("k")).alias("hk"))
        .collect()
    ]
    _, n_zone, n_total = t.read_pruned_in("hkey", probes)
    assert n_zone == n_total, (n_zone, n_total)
    t.build_bloom_index(["hkey"])
    df, n_bloom, _ = t.read_pruned_in("hkey", probes)
    assert n_bloom < n_zone, (n_bloom, n_zone)
    return df.select(F.col("o_orderkey").alias("k"), "o_totalprice")


_GENERATED_SQL = """
SELECT o_orderstatus AS status,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM orders
GROUP BY 1
"""


@register("x_generated_columns", oracle=_GENERATED_SQL, tags=("S6", "F5"), doc="")
def x_generated_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GENERATED ALWAYS AS (Delta generated columns, r10): the table
    declares revenue_cents = round(o_totalprice*100) — declaration
    backfills the snapshot in one materializing commit; afterwards an
    appended batch LACKING the column gets it computed (staying on the
    O(batch) AddFile path — asserted via base_dirs), and a batch carrying
    a WRONG explicit value is rejected before publish by the implicit
    null-safe CHECK riding the constraints plumbing (asserted in-query
    with a poisoned row). The integer-cents materialization is the
    classic use: exact downstream aggregation without re-deriving the
    expression in every query. Oracle recomputes the generation
    expression relationally over pristine orders — the hash proves both
    the backfill and the write-time computation are exact."""
    import tempfile

    from ..sources.constraints import ConstraintViolation
    from ..sources.table_format import VersionedTable

    o = T(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    half = o.agg((F.max("o_orderkey") / 2).cast("long")).first()[0]
    t = VersionedTable(spark, tempfile.mkdtemp(prefix="rdl_gencol_"))
    t.overwrite(o.filter(F.col("o_orderkey") <= half))
    t.add_generated("revenue_cents", "CAST(round(o_totalprice * 100) AS BIGINT)")
    # a later batch lacking the column gets it computed — AddFile path
    v3 = t.append(o.filter(F.col("o_orderkey") > half))
    assert t._manifest(v3).get("base_dirs"), "append fell off the AddFile path"
    # a wrong explicit value can never publish
    try:
        t.append(
            spark.createDataFrame(
                [(0, "F", 1.0, 42)],
                "o_orderkey long, o_orderstatus string, "
                "o_totalprice double, revenue_cents bigint",
            )
        )
        raise AssertionError("poisoned generated value published")
    except ConstraintViolation:
        pass

    return t.read().groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("revenue_cents").alias("revenue_cents"),
    )


_LOG_CHECKPOINT_SQL = f"""
SELECT o_orderstatus AS status,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       {sql_dsum("o_totalprice", scale=2)} AS revenue
FROM orders
WHERE o_orderkey % 8 < 4
GROUP BY 1
"""


@register("x_delta_log_checkpoint", oracle=_LOG_CHECKPOINT_SQL, tags=("S6",), doc="")
def x_delta_log_checkpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log checkpoint (Delta's ``_last_checkpoint``): every read and
    every commit resolves the table head first, and without a checkpoint
    that is a full manifest-directory LISTING — at 10^6 commits, ~0.9 s
    of driver I/O per operation (measured, tools/bench_log_checkpoint.py;
    SCALE.md round-10 table). ``checkpoint_log()`` records the committed
    head; resolution then probes forward with O(commits-since-checkpoint)
    stat calls — 0.05 ms flat at any table age. The chain here: 4 appends,
    checkpoint, 4 more appends — the head must resolve PAST the
    checkpoint through the probe (asserted in-query, plus the checkpoint
    file's content), and the assembled table must equal the oracle's
    plain predicate over pristine orders."""
    import tempfile

    from ..sources.table_format import VersionedTable

    o = T(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    t = VersionedTable(spark, tempfile.mkdtemp(prefix="rdl_logcp_"))
    for i in range(4):
        t.append(o.filter(F.col("o_orderkey") % 8 == i))
    assert t.checkpoint_log() == 4 and t._read_log_checkpoint() == 4
    for i in range(4, 8):
        t.append(o.filter(F.col("o_orderkey") % 8 == i))
    assert t.current_version() == 8  # resolved by probing past the checkpoint

    return (
        t.read()
        .filter(F.col("o_orderkey") % 8 < 4)
        .groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", scale=2).alias("revenue"),
        )
    )


_GROUPING_ID_SQL = f"""
SELECT COALESCE(o_orderstatus, '<all>') AS status,
       COALESCE(o_orderpriority, '<all>') AS priority,
       CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
       CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
       CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority)
            AS BIGINT) AS gid,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       {sql_dsum("o_totalprice", scale=2)} AS revenue
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


@register("x_grouping_id_rollup", oracle=_GROUPING_ID_SQL, tags=("A4",), doc="")
def x_grouping_id_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING() / grouping_id() over CUBE — the disambiguation surface
    A4's rollup/cube queries leave implicit: a NULL in a cube result is
    ambiguous between 'this level aggregates the column away' and 'the
    data value IS NULL'; GROUPING() is the standard SQL bit that settles
    it, and grouping_id() the packed level selector BI layers pivot on.
    Emitted alongside COALESCE'd labels so every (level, value) cell is
    self-describing. One shuffle for all four cube levels (Spark expands
    grouping sets BEFORE the exchange — partial aggregation applies per
    level). Both engines compute the same bits; gid is derived as
    g_status*2 + g_priority on both sides for literal parity."""
    o = T(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").cast("long").alias("g_status"),
            F.grouping("o_orderpriority").cast("long").alias("g_priority"),
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", scale=2).alias("revenue"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("<all>")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("<all>")).alias("priority"),
            "g_status",
            "g_priority",
            (F.col("g_status") * 2 + F.col("g_priority")).cast("long").alias("gid"),
            "n_orders",
            "revenue",
        )
    )


_FIRST_VALUE_DEDUP_SQL = f"""
WITH keyed AS (
  SELECT o_custkey, o_orderkey, o_totalprice, o_orderdate,
         DATEDIFF('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
           * 100000000000 + o_orderkey AS ord
  FROM orders),
latest AS (
  SELECT o_custkey,
         arg_max(o_orderkey, ord) AS last_orderkey,
         arg_max(o_totalprice, ord) AS last_price,
         MAX(CAST(o_orderdate AS DATE)) AS last_date,
         CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM keyed GROUP BY o_custkey)
SELECT o_custkey AS custkey, last_orderkey, last_price, last_date, n_orders
FROM latest
"""


@register("x_first_value_dedup", oracle=_FIRST_VALUE_DEDUP_SQL, tags=("O4", "A1"), doc="")
def x_first_value_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-record-wins dedup as ONE aggregation (max_by / arg_max):
    the survivor-per-key pattern done with ordered-selection aggregates
    instead of a window + filter — no row_number, no per-key sort, just
    a hash aggregate with partial (map-side) combine, which at 100 TB is
    one shuffle of pre-combined per-key candidates instead of a full
    windowed sort of every version. The ordering key is a (date, id)
    STRUCT so ties on the date break deterministically on the id — the
    total-order rule every dedup here follows. Engine parity: Spark
    max_by(x, struct(d, k)) ≡ DuckDB arg_max(x, (d, k))."""
    o = T(spark, sf_dir, "orders")
    ordk = (
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
        ).cast("long")
        * F.lit(100_000_000_000)
        + F.col("o_orderkey")
    )
    return o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.max_by("o_orderkey", ordk).alias("last_orderkey"),
        F.max_by("o_totalprice", ordk).alias("last_price"),
        F.max(F.col("o_orderdate").cast("date")).alias("last_date"),
        F.count(F.lit(1)).alias("n_orders"),
    )


_TYPE_WIDENING_SQL = """
WITH unioned AS (
  SELECT CAST(o_orderkey AS BIGINT) AS k,
         CAST(CAST(o_totalprice AS REAL) AS DOUBLE) AS p
  FROM orders WHERE o_orderkey % 2 = 0
  UNION ALL
  SELECT o_orderkey, o_totalprice + 0.25 FROM orders WHERE o_orderkey % 2 = 1)
SELECT k % 10 AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(ROUND(SUM(CAST(p AS DECIMAL(38,14))), 2) AS DOUBLE) AS total_p
FROM unioned GROUP BY 1
"""


@register("x_type_widening", oracle=_TYPE_WIDENING_SQL, tags=("S6", "F5"), doc="")
def x_type_widening(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type widening across appends (Delta's type-widening matrix): the
    table starts with INT keys + FLOAT prices, a later batch arrives with
    BIGINT keys + DOUBLE prices, and the append widens the column types
    (int→bigint, float→double) while preserving every old row's value at
    the new width — asserted in-query (dtypes before/after) and via the
    oracle, whose CTE replays the exact float→double round-trip on the
    old rows (CAST(CAST(p AS REAL) AS DOUBLE)) so the widened values hash
    bit-for-bit. The widening matrix is ENFORCED: a string batch into a
    numeric column raises instead of Spark's silent coerce-to-string
    (asserted with a poisoned batch). At 100 TB widening is one
    materializing rewrite, and the guard is what keeps one bad upstream
    batch from silently retyping the table."""
    import tempfile

    from ..sources.table_format import VersionedTable

    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    t = VersionedTable(spark, tempfile.mkdtemp(prefix="rdl_widen_"))
    t.overwrite(
        o.filter(F.col("o_orderkey") % 2 == 0).select(
            F.col("o_orderkey").cast("int").alias("k"),
            F.col("o_totalprice").cast("float").alias("p"),
        )
    )
    assert dict(t.read().dtypes) == {"k": "int", "p": "float"}
    t.append(
        o.filter(F.col("o_orderkey") % 2 == 1).select(
            F.col("o_orderkey").alias("k"),
            (F.col("o_totalprice") + 0.25).alias("p"),
        )
    )
    assert dict(t.read().dtypes) == {"k": "bigint", "p": "double"}
    try:
        t.append(spark.createDataFrame([("oops", 1.0)], "k string, p double"))
        raise AssertionError("silent retype published")
    except ValueError:
        pass

    # scale=14 (not 2): even rows round-tripped through FLOAT, and a
    # float32-origin double is NOT on the 2-decimal grid — casting it to
    # DECIMAL(_,2) rounds per-row at the cent boundary where Spark
    # (HALF_UP on shortest repr) and DuckDB (round of binary) disagree
    # (the r10 red-row class; this one surfaced when the r11 mirror went
    # full-precision). At scale 14 every float32 price's dyadic expansion
    # fits exactly, the sum is tie-free, and ROUND(.,2) is then decimal
    # arithmetic — identical on both engines.
    return t.read().groupBy((F.col("k") % 10).alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum(F.col("p").cast("decimal(38,14)")), 2)
        .cast("double")
        .alias("total_p"),
    )


_HILBERT_SQL = f"""
SELECT CAST(year(o_orderdate) AS INT) AS yr,
       COUNT(*) AS n_orders,
       {sql_dsum("o_totalprice", scale=2)} AS revenue
FROM orders
GROUP BY 1
"""


@register("x_hilbert_layout", oracle=_HILBERT_SQL, tags=("S3", "P4"), doc="")
def x_hilbert_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert-curve clustering (operators/zorder.py::hilbert_order_by) —
    the locality upgrade over the Morton/Z curve: Hilbert is CONTINUOUS
    (adjacent curve positions are adjacent grid cells; Morton jumps
    across quadrant seams), so contiguous curve segments → files with
    tighter bounding rectangles → better min/max skipping on the SAME
    file count and on EITHER dimension (why Databricks liquid clustering
    and Redshift moved Morton → Hilbert). The curve value is an
    Arrow-vectorized numpy kernel (16 bitwise passes per batch — the
    rot() recurrence rebinds x/y per level, which a column-expression
    unrolling turns into a 4^16-node tree; the documented Pandas-UDF
    escape hatch), computed ONCE at write time, never in the read path.
    In-query asserts: a VersionedTable laid out on hilbert(custkey, day)
    zone-prunes BOTH a custkey range and a day range (n_read < n_total
    each way). Oracle = the same aggregate on pristine orders: layout is
    a pure physical change."""
    import tempfile

    from ..operators.zorder import hilbert_order_by
    from ..sources.table_format import VersionedTable

    o = T(spark, sf_dir, "orders").withColumn(
        "o_day",
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")),
    )
    laid = hilbert_order_by(o, ["o_custkey", "o_day"], n_partitions=8)
    t = VersionedTable(spark, tempfile.mkdtemp(prefix="rdl_hilbert_"))
    t.overwrite(laid)  # manifest records per-file min/max of BOTH dims

    mxc = o.agg(F.max("o_custkey")).first()[0]
    _, nc, tot1 = t.read_pruned("o_custkey", 1, mxc // 10)
    _, nd, tot2 = t.read_pruned("o_day", 400, 500)
    assert 0 < nc < tot1, (nc, tot1)  # custkey range prunes
    assert 0 < nd < tot2, (nd, tot2)  # day range prunes THE SAME layout
    return (
        t.read()
        .groupBy(F.year("o_orderdate").cast("int").alias("yr"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", scale=2).alias("revenue"),
        )
    )


_HILBERT_OPT_SQL = f"""
SELECT o_orderpriority AS priority,
       CAST(year(o_orderdate) AS INT) AS yr,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       {sql_dsum("o_totalprice", scale=2)} AS revenue
FROM orders
GROUP BY 1, 2
"""


@register("x_hilbert_optimize", oracle=_HILBERT_OPT_SQL, tags=("S3", "P4", "S6"), doc="")
def x_hilbert_optimize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert layout as the MAINTAINED clustering of incremental OPTIMIZE
    (r11 — the liquid-clustering completion): `optimize_incremental(...,
    layout="hilbert")` re-clusters on the curve distance over a FIXED
    min-max domain persisted in the manifest (`hilbert_domain`, found by
    parent-chain walk so appends need not carry it), and each clustered
    file records its d-interval as a synthetic stats key so overlap
    planning stays the same 1-D interval math. Files appended since the
    last optimize lack the key; ONE O(new data) scan computes their real
    d-intervals, so grouping pulls in only the clustered files they
    genuinely overlap — a localized append rewrites a handful of files
    and the table converges to a no-op in one run (all asserted
    in-query). At 100 TB this is the difference between Databricks-style
    liquid clustering (hourly optimize costs O(hourly data)) and a
    nightly full re-sort. Pruning asserts: after optimize + append +
    re-optimize, a custkey range AND a day range each read a strict
    subset of files from manifest stats alone. Oracle = the same
    aggregate on pristine orders: every layout/optimize step is a pure
    physical change."""
    import tempfile

    from ..sources.table_format import VersionedTable

    o = T(spark, sf_dir, "orders").withColumn(
        "o_day",
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")),
    )
    mxd, mxc, n = o.agg(F.max("o_day"), F.max("o_custkey"), F.count(F.lit(1))).first()
    rpf = max(200, n // 8)  # ~8 clustered files at every scale factor
    cut = mxd - 100  # data-derived split: the "new days" tail
    t = VersionedTable(spark, tempfile.mkdtemp(prefix="rdl_hopt_"))
    t.overwrite(o.filter(F.col("o_day") <= cut).repartition(6))  # unclustered

    r1 = t.optimize_incremental(
        ("o_custkey", "o_day"), rows_per_file=rpf, layout="hilbert"
    )
    e1 = t._manifest(r1["version"])
    assert e1["cluster_by"] == ["o_custkey", "o_day"]
    assert e1["hilbert_domain"]["cols"] == ["o_custkey", "o_day"]

    late = o.filter(F.col("o_day") > cut)
    assert late.count() > 0
    t.append(late)
    r2 = t.optimize_incremental(
        ("o_custkey", "o_day"), rows_per_file=rpf, layout="hilbert"
    )
    # O(changed): the localized append rewrites only the files its
    # d-interval genuinely overlaps, never the whole clustered set
    assert 0 < r2["rewritten"] < r2["rewritten"] + r2["carried"], r2
    r3 = t.optimize_incremental(
        ("o_custkey", "o_day"), rows_per_file=rpf, layout="hilbert"
    )
    assert r3["rewritten"] == 0, r3  # converged: one run, then no-op

    _, nc, tot1 = t.read_pruned("o_custkey", 1, mxc // 10)
    _, nd, tot2 = t.read_pruned("o_day", cut - 300, cut - 200)
    assert 0 < nc < tot1, (nc, tot1)  # custkey range prunes
    assert 0 < nd < tot2, (nd, tot2)  # day range prunes THE SAME layout
    return t.read().groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.year("o_orderdate").cast("int").alias("yr"),
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice", scale=2).alias("revenue"),
    )


_DELTA_EXPORT_SQL = f"""
WITH t AS (SELECT * FROM orders WHERE o_orderkey % 5 != 0)
SELECT o_orderpriority AS priority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_custs,
       {sql_dsum("o_totalprice", scale=2)} AS revenue
FROM t GROUP BY 1
"""


@register("x_delta_export", oracle=_DELTA_EXPORT_SQL, tags=("S3", "S6"), doc="")
def x_delta_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-log EXPORT interop (r11, VERDICT r10 item 7):
    `VersionedTable.export_delta_log()` writes a REAL Delta transaction
    log (`_delta_log/%020d.json`, protocol/metaData/add actions per the
    public Delta protocol) beside the existing parquet — Delta's own
    CONVERT TO DELTA direction, zero data bytes copied. The round-trip
    here is deliberately INDEPENDENT of the table code: this query
    re-reads the snapshot purely from the exported log — a ~10-line
    stdlib-JSON parser (what delta-rs/duckdb-delta would do) resolves
    the add-file paths, Spark reads exactly those parquet files, and
    the DuckDB oracle recomputes the aggregate from pristine orders. A
    hash match proves the log's file list reconstructs the snapshot
    bit-for-bit (the container lacks delta-rs/delta-spark binaries —
    offline — so the external-engine leg is this spec-level parser;
    the log format itself is the interop surface). Exercises the
    interesting shape: append + incremental optimize first, so the
    exported adds span SEVERAL directories via the file-granular
    manifest."""
    import json as _json
    import os as _os
    import tempfile
    from urllib.parse import unquote

    from pyspark.sql.types import StructType

    from ..sources.table_format import VersionedTable

    o = T(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 5 != 0)
    cut = o.agg(F.max("o_orderkey")).first()[0] * 8 // 10  # data-derived
    low, k = F.col("o_orderkey") <= cut, F.col("o_orderkey")
    t = VersionedTable(spark, tempfile.mkdtemp(prefix="rdl_dexp_"))
    t.overwrite(o.filter(low & (k % 2 == 0)), cluster_by=["o_orderkey"], cluster_files=4)
    t.append(o.filter(low & (k % 2 == 1)))  # interleaves: forces rewrite
    # disjoint high range as ONE file so it lands as a singleton overlap
    # group and is carried by reference at ANY scale (uncoalesced, a
    # larger input splits into several full-range-overlapping files and
    # the carried>0 probe turns scale-dependent — the sf1-rehearsal class)
    t.append(o.filter(~low).coalesce(1))
    r = t.optimize_incremental("o_orderkey", rows_per_file=max(200, o.count() // 6))
    assert r["rewritten"] > 0 and r["carried"] > 0, r
    commit = t.export_delta_log()

    # ---- independent spec-level reader: stdlib JSON only, no table code
    adds, schema_str, protocol = [], None, None
    with open(commit) as fh:
        for line in fh:
            a = _json.loads(line)
            if "add" in a:
                adds.append(a["add"])
            elif "metaData" in a:
                schema_str = a["metaData"]["schemaString"]
            elif "protocol" in a:
                protocol = a["protocol"]
    assert protocol == {"minReaderVersion": 1, "minWriterVersion": 2}
    assert _os.path.basename(commit) == f"{0:020d}.json"
    schema = StructType.fromJson(_json.loads(schema_str))  # valid Delta schemaString
    paths = [_os.path.join(t.path, unquote(a["path"])) for a in adds]
    assert len({_os.path.dirname(p) for p in paths}) >= 2  # spans dirs (optimize)
    assert all(_os.path.getsize(p) == a["size"] for p, a in zip(paths, adds))
    n_log = sum(_json.loads(a["stats"])["numRecords"] for a in adds)

    df = spark.read.schema(schema).parquet(*paths)
    got = df.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_custs"),
        dsum("o_totalprice", scale=2).alias("revenue"),
    )
    assert n_log == o.count()  # add-file stats account for every row
    return got


_DELTA_EXPORT_INC_SQL = f"""
WITH t AS (
  SELECT * FROM orders
  WHERE o_orderkey % 11 != 3 AND o_orderkey % 7 != 0)
SELECT o_orderstatus AS status,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       {sql_dsum("o_totalprice", scale=2)} AS revenue
FROM t GROUP BY 1
"""


@register(
    "x_delta_export_incremental",
    oracle=_DELTA_EXPORT_INC_SQL,
    tags=("S3", "S6", "S7"),
    doc="",
)
def x_delta_export_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL Delta-log export — the keep-in-sync direction (r11;
    x_delta_export is the one-shot CONVERT): each `export_delta_log()`
    call after the first writes only the DIFF as the next %020d commit —
    `add` actions for new files, `remove` actions for files the snapshot
    dropped — O(changed files) per sync whatever the table size, exactly
    how a Delta writer maintains its log. The table here goes overwrite
    → export(0) → append → export(1: adds only) → DELETE (materializing
    rewrite) → export(2: adds + removes); a re-export at the same
    version is an idempotent no-op (asserted). The round-trip reader is
    INDEPENDENT of table code: stdlib JSON replays add/remove across the
    three commits in filename order (a remove cancels a prior add — the
    Delta reconciliation rule), Spark reads exactly the surviving file
    set, and the DuckDB oracle recomputes the final state relationally.
    A hash match proves multi-commit log reconstruction equals the live
    snapshot."""
    import json as _json
    import os as _os
    import tempfile
    from urllib.parse import unquote

    from ..sources.table_format import VersionedTable

    o = T(spark, sf_dir, "orders")
    t = VersionedTable(spark, tempfile.mkdtemp(prefix="rdl_dexpi_"))
    t.overwrite(
        o.filter(F.col("o_orderkey") % 11 != 3).filter(F.col("o_orderkey") % 2 == 0),
        cluster_by=["o_orderkey"],
        cluster_files=4,
    )
    c0 = t.export_delta_log()
    t.append(
        o.filter(F.col("o_orderkey") % 11 != 3)
        .filter(F.col("o_orderkey") % 2 == 1)
        .coalesce(1)
    )
    c1 = t.export_delta_log()
    t.delete("o_orderkey % 7 = 0")  # materializing rewrite: adds + removes
    c2 = t.export_delta_log()
    assert t.export_delta_log() == c2  # same version: idempotent no-op
    log_dir = _os.path.dirname(c2)
    assert [_os.path.basename(p) for p in (c0, c1, c2)] == [
        f"{i:020d}.json" for i in range(3)
    ]

    # ---- independent multi-commit reader: stdlib JSON, Delta rules
    live: dict = {}
    n_removes = 0
    for fn in sorted(_os.listdir(log_dir)):
        with open(_os.path.join(log_dir, fn)) as fh:
            for line in fh:
                a = _json.loads(line)
                if "add" in a:
                    live[unquote(a["add"]["path"])] = a["add"]
                elif "remove" in a:
                    live.pop(unquote(a["remove"]["path"]), None)
                    n_removes += 1
    assert n_removes > 0  # the delete really exported removes
    paths = [_os.path.join(t.path, rel) for rel in live]
    return (
        spark.read.parquet(*paths)
        .groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", scale=2).alias("revenue"),
        )
    )


_BUCKET_PRUNE_SQL = f"""
WITH pick AS (SELECT MAX(o_custkey) // 2 AS ck FROM orders)
SELECT o_orderstatus AS status,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       {sql_dsum("o_totalprice", scale=2)} AS revenue
FROM orders, pick
WHERE o_custkey = ck
GROUP BY 1
"""


@register("x_bucket_pruning", oracle=_BUCKET_PRUNE_SQL, tags=("S3", "P4", "J1"), doc="")
def x_bucket_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BUCKET PRUNING — the read-side payoff of bucketed storage beyond
    zero-shuffle joins (x_bucketed_colocated_join): a point predicate on
    the bucketing key lets the scan open ONLY the bucket whose Murmur3
    hash the literal lands in, skipping the other N-1 bucket files with
    zero I/O. The physical plan is asserted in-query: `SelectedBucketsCount:
    1 out of 8` must appear in the FileScan (Catalyst derives it from the
    catalog's bucket spec — no manifest needed). At 100 TB with 4096
    buckets, a customer-lookup dashboard reads 1/4096th of the table per
    query; this is the poor man's index Spark ships natively. Oracle =
    the same point filter on pristine orders (bucketing is pure layout)."""
    import shutil

    from ..sources.bucketing import write_bucketed
    from .lakehouse import _scratch

    o = T(spark, sf_dir, "orders")
    ck = o.agg(F.max("o_custkey")).first()[0] // 2  # data-derived key
    tag = sf_dir.strip("/").replace("/", "_").replace(".", "_")
    tbl = f"rdl_orders_bp_{tag}"
    path = _scratch(tbl)
    shutil.rmtree(path, ignore_errors=True)
    write_bucketed(o, tbl, ["o_custkey"], n_buckets=8, path=path)

    # DisableUnnecessaryBucketedScan turns the bucketed scan off when no
    # join/aggregation consumes the bucket order — but that also forfeits
    # bucket PRUNING. Pin it on for the lookup (set at runtime so the
    # vanilla driver session behaves identically), restore after.
    saved = spark.conf.get(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", "true"
    )
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        res = (
            spark.table(tbl)
            .filter(F.col("o_custkey") == ck)
            .groupBy(F.col("o_orderstatus").alias("status"))
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                dsum("o_totalprice", scale=2).alias("revenue"),
            )
        )
        plan = res._jdf.queryExecution().executedPlan().toString()
        assert "SelectedBucketsCount: 1 out of 8" in plan, plan[:2000]
        res = res.persist()
        res.count()  # materialize under the pinned conf
    finally:
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", saved
        )
    return res


_MERGE_NMBS_SQL = f"""
WITH bounds AS (SELECT CAST(MAX(o_orderdate) AS DATE) - 365 AS cut FROM orders),
src AS (  -- the operational feed: last year's orders, re-priced
  SELECT o_orderkey, o_totalprice * 1.0 + 10.0 AS o_totalprice,
         'URGENT' AS o_orderpriority
  FROM orders, bounds WHERE CAST(o_orderdate AS DATE) >= cut),
synced AS (
  SELECT t.o_orderkey, t.o_orderstatus,
         COALESCE(s.o_totalprice, t.o_totalprice) AS o_totalprice,
         COALESCE(s.o_orderpriority, t.o_orderpriority) AS o_orderpriority
  FROM orders t LEFT JOIN src s ON t.o_orderkey = s.o_orderkey
  WHERE s.o_orderkey IS NOT NULL         -- matched: updated in place
     OR NOT (t.o_orderstatus = 'F')      -- unmatched: deleted only when final
)
SELECT o_orderpriority AS priority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       {sql_dsum("o_totalprice", scale=2)} AS revenue
FROM synced GROUP BY 1
"""


@register(
    "x_merge_not_matched_by_source",
    oracle=_MERGE_NMBS_SQL,
    tags=("S7", "J3", "J6"),
    doc="",
)
def x_merge_not_matched_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE's third leg — ``WHEN NOT MATCHED BY SOURCE`` (Delta 2.3+ /
    SQL:2003 full MERGE), the clause upserts can't express: the source
    feed carries current truth for its keys, matched target rows update
    in place, and target rows the feed NO LONGER mentions retire — here
    conditionally (``DELETE`` only finalized 'F' orders; open ones are
    kept awaiting their feed record). This is the mirror-an-operational-
    table pattern: without this clause a warehouse either full-overwrites
    (O(table) every sync) or accretes ghosts forever.
    `operators/merge.py::merge_sync` runs it as ONE left join (update +
    conditional-retire in a single pass, explicit match marker so NULL
    source values don't read as unmatched) + one anti-join for inserts —
    two key shuffles, broadcastable source, no window. The feed is
    derived (last year re-priced, +10.00 exact at scale 2) so the oracle
    replays the same three-legged semantics relationally."""
    from ..operators.merge import merge_sync

    o = T(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority", "o_orderdate"
    )
    cut = F.date_sub(
        F.lit(o.agg(F.max(F.col("o_orderdate").cast("date"))).first()[0]), 365
    )
    src = o.filter(F.col("o_orderdate").cast("date") >= cut).select(
        "o_orderkey",
        (F.col("o_totalprice") + 10.0).alias("o_totalprice"),
        F.lit("URGENT").alias("o_orderpriority"),
    )
    synced = merge_sync(
        o.drop("o_orderdate"),
        src,
        keys=["o_orderkey"],
        update_cols=["o_totalprice", "o_orderpriority"],
        delete_unmatched_when="o_orderstatus = 'F'",
    )
    return synced.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice", scale=2).alias("revenue"),
    )


_MV_ROLLUP_SQL = f"""
SELECT CAST(year(o_orderdate) AS INT) AS yr,
       CAST(month(o_orderdate) AS INT) AS mth,
       o_orderstatus AS status,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       {sql_dsum("o_totalprice", scale=2)} AS revenue,
       CAST(MIN(o_totalprice) AS DOUBLE) AS min_price,
       CAST(MAX(o_totalprice) AS DOUBLE) AS max_price
FROM orders
GROUP BY 1, 2, 3
"""


@register("x_mv_rollup_answer", oracle=_MV_ROLLUP_SQL, tags=("A1", "S3", "A7"), doc="")
def x_mv_rollup_answer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-view ROLLUP REWRITE — the aggregate-containment rule
    every BI layer and Spark's own MV engines (Databricks MVs, Kylin)
    live on: a DAILY rollup is materialized ONCE (day × status →
    count/sum/min/max partials), and the MONTHLY query is answered
    ENTIRELY from it — counts re-sum, sums re-sum, min/max re-aggregate
    (avg would recompose as Σsum/Σcount; distinct-counts would NOT — the
    classic non-rewritable aggregate). The raw table is never scanned by
    the monthly query (asserted: its only input is the rollup's path,
    ~2 orders of magnitude smaller). At 100 TB this converts every
    dashboard refresh from a fact-table scan into a rollup scan — the
    single highest-leverage read optimization after partition pruning.
    The oracle computes monthly straight from raw orders, so the hash
    proves containment-rewrite correctness, not just plumbing. Decimal
    partials: the rollup stores the EXACT decimal(25,4) day sums (cast
    to double only after the monthly re-sum would lose cents), so
    two-level summation equals one-level."""
    import tempfile

    o = T(spark, sf_dir, "orders")
    # ---- materialize the daily rollup once (the MV maintenance job)
    daily = o.groupBy(
        F.col("o_orderdate").alias("day"), F.col("o_orderstatus").alias("status")
    ).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col("o_totalprice").cast("decimal(25,4)")).alias("sum_price"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
    )
    mv_path = tempfile.mkdtemp(prefix="rdl_mv_") + "/daily_rollup"
    daily.write.mode("overwrite").parquet(mv_path)

    # ---- the monthly query reads ONLY the rollup
    mv = spark.read.parquet(mv_path)
    n_mv, n_raw = mv.count(), o.count()
    assert n_mv < n_raw, (n_mv, n_raw)  # strictly coarser
    monthly = mv.groupBy(
        F.year("day").cast("int").alias("yr"),
        F.month("day").cast("int").alias("mth"),
        "status",
    ).agg(
        F.sum("cnt").cast("long").alias("n_orders"),
        F.round(F.sum("sum_price"), 2).cast("double").alias("revenue"),
        F.min("min_price").cast("double").alias("min_price"),
        F.max("max_price").cast("double").alias("max_price"),
    )
    scan_src = [
        ln
        for ln in monthly._jdf.queryExecution().executedPlan().toString().splitlines()
        if "FileScan" in ln or "Location" in ln
    ]
    assert all("orders.parquet" not in ln for ln in scan_src), scan_src
    return monthly


_PSI_SQL = """
WITH span AS (
  SELECT CAST(MIN(o_orderdate) AS DATE) AS d0, CAST(MAX(o_orderdate) AS DATE) AS d1,
         CAST(ROUND(MIN(o_totalprice) * 100) AS BIGINT) AS mnc,
         CAST(ROUND(MAX(o_totalprice) * 100) AS BIGINT) AS mxc
  FROM orders),
tagged AS (
  SELECT CASE WHEN CAST(o_orderdate AS DATE) < d0 + CAST((d1 - d0) // 2 AS INT) THEN 'A' ELSE 'B' END AS slice,
         LEAST(9, ((CAST(ROUND(o_totalprice * 100) AS BIGINT) - mnc) * 10) // (mxc - mnc)) AS bucket
  FROM orders, span),
cnt AS (
  SELECT bucket,
         SUM(CASE WHEN slice = 'A' THEN 1 ELSE 0 END) AS cnt_a,
         SUM(CASE WHEN slice = 'B' THEN 1 ELSE 0 END) AS cnt_b
  FROM tagged GROUP BY 1),
tot AS (SELECT SUM(cnt_a) AS na, SUM(cnt_b) AS nb FROM cnt)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(cnt_a AS BIGINT) AS cnt_a,
       CAST(cnt_b AS BIGINT) AS cnt_b,
       CAST(FLOOR((
         (CAST(cnt_b + 1 AS DOUBLE) / (nb + 10)) - (CAST(cnt_a + 1 AS DOUBLE) / (na + 10))
       ) * LN((CAST(cnt_b + 1 AS DOUBLE) / (nb + 10)) / (CAST(cnt_a + 1 AS DOUBLE) / (na + 10)))
         * 1000000) AS BIGINT) AS psi_contrib_q6
FROM cnt, tot
"""


@register("x_psi_drift", oracle=_PSI_SQL, tags=("A1", "A6", "DQ"), doc="")
def x_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index — the standard data-drift monitor
    (credit scoring's PSI, what Evidently/Deequ-style DQ suites compute
    per column per refresh): compare the price distribution of the
    FIRST half of the time range against the SECOND across 10 equi-width
    buckets; per-bucket contribution (pB-pA)·ln(pB/pA) with +1 Laplace
    smoothing flags the drifting segment, Σ ≥ 0.2 is the classic alarm.
    Cross-engine discipline: bucketing is pure INTEGER math (cents via
    round(p·100) — Spark CAST truncates doubles where DuckDB rounds, so
    never bare-cast — then integer div against data-derived cent
    bounds), so both engines bin identically; the only float, the PSI
    term, is computed from identical integers and QUANTIZED to
    floor(·1e6) (ln is libm, last-ulp divergent — the f3 lesson). One
    scan + one 10-row aggregate: at 100 TB this is a free rider on any
    existing daily stats pass."""
    o = T(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    d0, d1, mnc, mxc = o.agg(
        F.min(d),
        F.max(d),
        F.round(F.min("o_totalprice") * 100).cast("long"),
        F.round(F.max("o_totalprice") * 100).cast("long"),
    ).first()
    half = (d1 - d0).days // 2
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    tagged = o.select(
        F.when(d < F.date_add(F.lit(d0), half), "A").otherwise("B").alias("slice"),
        F.least(F.lit(9), ((cents - mnc) * 10).cast("long") / F.lit(int(mxc - mnc)))
        .cast("long")
        .alias("bucket"),
    )
    cnt = tagged.groupBy("bucket").agg(
        F.sum((F.col("slice") == "A").cast("int")).alias("cnt_a"),
        F.sum((F.col("slice") == "B").cast("int")).alias("cnt_b"),
    )
    na, nb = cnt.agg(F.sum("cnt_a"), F.sum("cnt_b")).first()
    pa = (F.col("cnt_a") + 1).cast("double") / F.lit(float(na + 10))
    pb = (F.col("cnt_b") + 1).cast("double") / F.lit(float(nb + 10))
    return cnt.select(
        F.col("bucket").cast("long").alias("bucket"),
        F.col("cnt_a").cast("long").alias("cnt_a"),
        F.col("cnt_b").cast("long").alias("cnt_b"),
        F.floor((pb - pa) * F.log(pb / pa) * 1000000)
        .cast("long")
        .alias("psi_contrib_q6"),
    )


_BFS_SQL = """
WITH edges AS (
  SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
seeds AS (SELECT DISTINCT c FROM edges WHERE c % 1000 = 0),
h2 AS (
  SELECT DISTINCT e2.c
  FROM edges e1 JOIN seeds s ON e1.c = s.c JOIN edges e2 ON e2.p = e1.p
  WHERE e2.c NOT IN (SELECT c FROM seeds)),
h4 AS (
  SELECT DISTINCT e2.c
  FROM edges e1 JOIN h2 ON e1.c = h2.c JOIN edges e2 ON e2.p = e1.p
  WHERE e2.c NOT IN (SELECT c FROM seeds)
    AND e2.c NOT IN (SELECT c FROM h2)),
lab AS (
  SELECT c, 0 AS hop FROM seeds
  UNION ALL SELECT c, 2 FROM h2
  UNION ALL SELECT c, 4 FROM h4)
SELECT CAST(hop AS BIGINT) AS hop,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(c) AS BIGINT) AS cust_checksum
FROM lab GROUP BY 1
"""


@register("x_bfs_reachability", oracle=_BFS_SQL, tags=("J1", "O3", "A1"), doc="")
def x_bfs_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative frontier BFS over the customer—part co-purchase graph
    (min-hop labeling, the Pregel/GraphX primitive under fraud rings,
    recommendation neighborhoods, and recall-expansion in retrieval):
    seed customers (key ≡ 0 mod 1000), expand two bipartite rounds
    (customer → parts bought → customers of those parts), each round ONE
    hash-join against the deduped edge list + an anti-join that keeps
    only NEWLY reached vertices — the frontier never rescans settled
    ones, which is what makes BFS O(edges·diameter), not O(edges·V). The
    edge list is built once, deduped, and persisted across rounds (at
    100 TB: bucket it on both keys). The oracle unrolls the SAME two
    rounds as plain CTEs — a fixed-depth BFS is relational, so the
    min-hop sets hash-check exactly (counts + checksums per hop)."""
    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    edges = (
        o.join(l, o["o_orderkey"] == l["l_orderkey"])
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct()
        .persist()
    )
    seeds = edges.select("c").filter(F.col("c") % 1000 == 0).distinct()
    assert seeds.count() > 0
    reached = seeds.withColumn("hop", F.lit(0)).persist()
    frontier = seeds
    for hop in (2, 4):
        parts = edges.join(frontier, "c").select("p").distinct()
        nxt = (
            edges.join(parts, "p")
            .select("c")
            .distinct()
            .join(reached.select("c"), "c", "left_anti")
            .persist()
        )
        reached = reached.unionByName(nxt.withColumn("hop", F.lit(hop))).persist()
        frontier = nxt
    return reached.groupBy(F.col("hop").cast("long").alias("hop")).agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("c").cast("long").alias("cust_checksum"),
    )


_DELTA_IMPORT_SQL = f"""
WITH t AS (SELECT * FROM orders WHERE o_orderkey % 13 != 5)
SELECT o_orderstatus AS status,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       {sql_dsum("o_totalprice", scale=2)} AS revenue
FROM t GROUP BY 1
"""


@register("x_delta_import_timetravel", oracle=_DELTA_IMPORT_SQL, tags=("S4", "S6"), doc="")
def x_delta_import_timetravel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-log IMPORT with time travel (`sources/delta_import.py` — the
    reader half of the interop surface, deliberately independent of
    VersionedTable: it consumes only the public log format, as delta-rs
    or duckdb-delta would). The table exports three delta commits
    (overwrite → append → delete); `read_delta_snapshot(version=1)`
    replays the log only THROUGH commit 1 — the Delta reconciliation
    rule in reverse-chronological refusal — so the delete is invisible
    and the returned aggregate equals the after-append state the oracle
    recomputes relationally. Also asserted: the latest-read equals the
    live table row-for-row (count + keyed checksum), and
    `delta_log_summary`'s zero-data-read stats account for every live
    row. The read schema comes from the log's schemaString, not parquet
    inference — the widened-type contract an external reader relies on."""
    import tempfile

    from ..sources.delta_import import delta_log_summary, read_delta_snapshot
    from ..sources.table_format import VersionedTable

    o = T(spark, sf_dir, "orders")
    keep = F.col("o_orderkey") % 13 != 5
    t = VersionedTable(spark, tempfile.mkdtemp(prefix="rdl_dimp_"))
    t.overwrite(
        o.filter(keep & (F.col("o_orderkey") % 2 == 0)),
        cluster_by=["o_orderkey"],
        cluster_files=4,
    )
    t.export_delta_log()  # commit 0
    t.append(o.filter(keep & (F.col("o_orderkey") % 2 == 1)).coalesce(1))
    t.export_delta_log()  # commit 1  <- the time-travel target
    t.delete("o_orderkey % 13 = 5 OR o_orderkey % 3 = 0")
    t.export_delta_log()  # commit 2

    # latest == live table (count + checksum, schema from the log)
    latest = read_delta_snapshot(spark, t.path)
    a = latest.agg(F.count(F.lit(1)), F.sum("o_orderkey")).first()
    b = t.read().agg(F.count(F.lit(1)), F.sum("o_orderkey")).first()
    assert (a[0], a[1]) == (b[0], b[1]), (a, b)
    summ = delta_log_summary(t.path)
    assert summ["n_commits"] == 3 and summ["n_removed"] > 0, summ
    assert summ["n_rows_from_stats"] == a[0], (summ, a[0])

    # time travel to commit 1: the delete must be invisible
    v1 = read_delta_snapshot(spark, t.path, version=1)
    return v1.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice", scale=2).alias("revenue"),
    )


_ICE_EXPORT_SQL = f"""
WITH t AS (SELECT * FROM orders WHERE o_orderkey % 5 != 2)
SELECT o_orderpriority AS priority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_custs,
       {sql_dsum("o_totalprice", scale=2)} AS revenue
FROM t GROUP BY 1
"""


@register("x_iceberg_export", oracle=_ICE_EXPORT_SQL, tags=("S3", "S6"), doc="")
def x_iceberg_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg metadata EXPORT interop (r12, VERDICT r11 item 2 — the
    counterpart of x_delta_export on the other side of the open-table-
    format fence): `VersionedTable.export_iceberg_metadata()` writes an
    Iceberg-v2-shaped metadata tree (v1.metadata.json + version-hint +
    snapshot -> manifest LIST -> manifests with field-id-keyed bounds)
    beside the existing parquet — Iceberg's own migrate/add_files
    direction, zero data bytes copied. The round-trip is INDEPENDENT of
    table code: this query walks version-hint -> metadata -> current
    snapshot -> manifest list -> manifest entries with stdlib JSON
    (what any Iceberg engine's planner does), asserts the spec shape
    (format-version 2, sequential field ids, per-manifest summary
    counts that ACCOUNT for every row without opening data), reads
    exactly the live files with the METADATA's schema (never parquet
    inference), and the DuckDB oracle recomputes the aggregate from
    pristine orders. Exercises the interesting layout: append +
    incremental optimize first, so the manifest spans several data
    directories via the file-granular manifest. Manifests serialize as
    JSON where the spec says Avro (no Avro tooling in the container) —
    same documented stand-in as the Delta leg."""
    import json as _json
    import os as _os
    import tempfile

    from ..sources.table_format import VersionedTable

    o = T(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 5 != 2)
    cut = o.agg(F.max("o_orderkey")).first()[0] * 8 // 10  # data-derived
    low, k = F.col("o_orderkey") <= cut, F.col("o_orderkey")
    t = VersionedTable(spark, tempfile.mkdtemp(prefix="rdl_iexp_"))
    t.overwrite(o.filter(low & (k % 2 == 0)), cluster_by=["o_orderkey"], cluster_files=4)
    t.append(o.filter(low & (k % 2 == 1)))  # interleaves: forces rewrite
    # disjoint high range as ONE file so it lands as a singleton overlap
    # group and is carried by reference at ANY scale (uncoalesced, a
    # larger input splits into several full-range-overlapping files and
    # the carried>0 probe turns scale-dependent — the sf1-rehearsal class)
    t.append(o.filter(~low).coalesce(1))
    r = t.optimize_incremental("o_orderkey", rows_per_file=max(200, o.count() // 6))
    assert r["rewritten"] > 0 and r["carried"] > 0, r
    meta_path = t.export_iceberg_metadata()

    # ---- independent spec-level planner walk: stdlib JSON only
    with open(_os.path.join(t.path, "metadata", "version-hint.text")) as fh:
        assert fh.read().strip() == "1"
    with open(meta_path) as fh:
        meta = _json.load(fh)
    assert meta["format-version"] == 2
    cur_schema = next(
        sc for sc in meta["schemas"]
        if sc["schema-id"] == meta["current-schema-id"]
    )
    fields = cur_schema["fields"]
    assert [f["id"] for f in fields] == list(range(1, len(fields) + 1))
    snap = next(
        s for s in meta["snapshots"]
        if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    with open(_os.path.join(t.path, snap["manifest-list"])) as fh:
        manifests = _json.load(fh)["manifests"]
    # the manifest-list summary layer accounts for every row, no data read
    n_list = sum(m["added_rows_count"] + m["existing_rows_count"] for m in manifests)
    entries = []
    for m in manifests:
        with open(_os.path.join(t.path, m["manifest_path"])) as fh:
            entries.extend(
                e for e in _json.load(fh)["entries"] if e["status"] != 2
            )
    paths = [_os.path.join(t.path, e["data_file"]["file_path"]) for e in entries]
    assert len({_os.path.dirname(p) for p in paths}) >= 2  # spans dirs (optimize)
    assert all(
        _os.path.getsize(p) == e["data_file"]["file_size_in_bytes"]
        for p, e in zip(paths, entries)
    )
    n_entries = sum(e["data_file"]["record_count"] for e in entries)
    assert n_list == n_entries == o.count()

    from ..sources.iceberg_import import _spark_schema

    df = spark.read.schema(
        _spark_schema(cur_schema)
    ).parquet(*paths)
    return df.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_custs"),
        dsum("o_totalprice", scale=2).alias("revenue"),
    )


_ICE_EXPORT_INC_SQL = f"""
WITH t AS (
  SELECT * FROM orders
  WHERE o_orderkey % 11 != 4 AND o_orderkey % 7 != 1)
SELECT o_orderstatus AS status,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       {sql_dsum("o_totalprice", scale=2)} AS revenue
FROM t GROUP BY 1
"""


@register(
    "x_iceberg_export_incremental",
    oracle=_ICE_EXPORT_INC_SQL,
    tags=("S3", "S6", "S7"),
    doc="",
)
def x_iceberg_export_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL Iceberg export — the keep-in-sync direction, and the
    structural contrast with x_delta_export_incremental: Delta appends a
    DIFF commit that readers must replay; Iceberg writes a new
    self-contained snapshot whose manifest list REUSES untouched
    manifests BY REFERENCE — O(new files) metadata written, O(1) for
    the carried million-file manifest, and readers never replay
    anything. The table goes overwrite -> export (snapshot 1) -> append
    -> export (snapshot 2: asserts the prior manifest_path is carried
    VERBATIM plus exactly one new manifest) -> delete (materializing
    rewrite) -> export (snapshot 3: the lost files surface as DELETED
    entries / summary counts). parent-snapshot-id chains the lineage,
    sequence numbers are 1..3, and a re-export at the same source
    version is an idempotent no-op (asserted). The final read resolves
    ONLY snapshot 3 (no history walk) via stdlib JSON and the DuckDB
    oracle recomputes the final state relationally."""
    import json as _json
    import os as _os
    import tempfile

    from ..sources.table_format import VersionedTable

    o = T(spark, sf_dir, "orders")
    keep = F.col("o_orderkey") % 11 != 4
    t = VersionedTable(spark, tempfile.mkdtemp(prefix="rdl_iexpi_"))
    t.overwrite(
        o.filter(keep & (F.col("o_orderkey") % 2 == 0)),
        cluster_by=["o_orderkey"],
        cluster_files=4,
    )
    m1 = t.export_iceberg_metadata()
    t.append(o.filter(keep & (F.col("o_orderkey") % 2 == 1)).coalesce(1))
    m2 = t.export_iceberg_metadata()
    assert t.export_iceberg_metadata() == m2  # same version: idempotent
    t.delete("o_orderkey % 7 = 1")  # materializing rewrite
    m3 = t.export_iceberg_metadata()
    assert [_os.path.basename(p) for p in (m1, m2, m3)] == [
        f"v{i}.metadata.json" for i in (1, 2, 3)
    ]

    def _load(p):
        with open(p) as fh:
            return _json.load(fh)

    def _list_of(meta, sid):
        s = next(x for x in meta["snapshots"] if x["snapshot-id"] == sid)
        return _load(_os.path.join(t.path, s["manifest-list"]))["manifests"]

    meta2, meta3 = _load(m2), _load(m3)
    l1 = _list_of(meta2, meta2["snapshots"][0]["snapshot-id"])
    l2 = _list_of(meta2, meta2["current-snapshot-id"])
    # append REUSED snapshot 1's manifest by reference + added ONE new
    assert {m["manifest_path"] for m in l1} < {m["manifest_path"] for m in l2}
    assert len(l2) == len(l1) + 1
    assert sum(m["added_files_count"] for m in l2) == 1
    # lineage: parent ids chain, sequence numbers advance 1..3
    snaps = meta3["snapshots"]
    assert [s["sequence-number"] for s in snaps] == [1, 2, 3]
    assert [s.get("parent-snapshot-id") for s in snaps] == [
        None, snaps[0]["snapshot-id"], snaps[1]["snapshot-id"]
    ]
    l3 = _list_of(meta3, meta3["current-snapshot-id"])
    assert sum(m["deleted_files_count"] for m in l3) > 0  # delete surfaced

    # ---- read = resolve snapshot 3 only (no replay), stdlib JSON
    live = []
    for m in l3:
        if m["added_files_count"] + m["existing_files_count"] == 0:
            continue
        for e in _load(_os.path.join(t.path, m["manifest_path"]))["entries"]:
            if e["status"] != 2:
                live.append(_os.path.join(t.path, e["data_file"]["file_path"]))
    return (
        spark.read.parquet(*live)
        .groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", scale=2).alias("revenue"),
        )
    )


_ICE_IMPORT_SQL = f"""
WITH t AS (
  SELECT * FROM orders WHERE o_orderkey % 13 != 6)
SELECT o_orderstatus AS status,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       {sql_dsum("o_totalprice", scale=2)} AS revenue
FROM t GROUP BY 1
"""


@register("x_iceberg_import_timetravel", oracle=_ICE_IMPORT_SQL, tags=("S4", "S6"), doc="")
def x_iceberg_import_timetravel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg metadata IMPORT with time travel
    (`sources/iceberg_import.py` — the reader half, deliberately
    independent of VersionedTable: it consumes only the exported
    metadata tree the way an Iceberg engine's planner does). The table
    exports three snapshots (overwrite -> append -> delete);
    `read_iceberg_snapshot(snapshot_id=<second>)` resolves the SECOND
    snapshot directly — Iceberg time travel is picking a different
    self-contained snapshot object, O(1) metadata choices, never a log
    replay — so the delete is invisible and the aggregate equals the
    after-append state the oracle recomputes. Also asserted: the latest
    read equals the live table (count + keyed checksum) under the
    METADATA's schema, and `iceberg_snapshot_summary`'s zero-data-read
    lineage accounts for every live row and the delete's lost files."""
    import tempfile

    from ..sources.iceberg_import import (
        iceberg_snapshot_summary,
        read_iceberg_snapshot,
    )
    from ..sources.table_format import VersionedTable

    o = T(spark, sf_dir, "orders")
    keep = F.col("o_orderkey") % 13 != 6
    t = VersionedTable(spark, tempfile.mkdtemp(prefix="rdl_iimp_"))
    t.overwrite(
        o.filter(keep & (F.col("o_orderkey") % 2 == 0)),
        cluster_by=["o_orderkey"],
        cluster_files=4,
    )
    t.export_iceberg_metadata()  # snapshot 1
    t.append(o.filter(keep & (F.col("o_orderkey") % 2 == 1)).coalesce(1))
    t.export_iceberg_metadata()  # snapshot 2  <- the time-travel target
    t.delete("o_orderkey % 13 = 6 OR o_orderkey % 3 = 1")
    t.export_iceberg_metadata()  # snapshot 3

    # latest == live table (count + checksum, schema from the metadata)
    latest = read_iceberg_snapshot(spark, t.path)
    a = latest.agg(F.count(F.lit(1)), F.sum("o_orderkey")).first()
    b = t.read().agg(F.count(F.lit(1)), F.sum("o_orderkey")).first()
    assert (a[0], a[1]) == (b[0], b[1]), (a, b)
    summ = iceberg_snapshot_summary(t.path)
    assert summ["n_snapshots"] == 3, summ
    assert summ["lineage"][-1]["live_rows"] == a[0], (summ, a[0])
    assert summ["lineage"][-1]["deleted_files"] > 0, summ
    assert summ["lineage"][-1]["operation"] == "overwrite", summ

    # time travel to snapshot 2: the delete must be invisible
    sid2 = summ["lineage"][1]["snapshot_id"]
    tv = read_iceberg_snapshot(spark, t.path, snapshot_id=sid2)
    return tv.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice", scale=2).alias("revenue"),
    )


_ASOF_NEAREST_SQL = """
WITH v AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts FROM events WHERE event_type = 'view'),
p AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts, value FROM events WHERE event_type = 'purchase'),
cand AS (
  SELECT v.event_id AS vid, v.user_id,
         p.event_id AS pid, ABS(p.ts - v.ts) AS dist,
         CASE WHEN p.ts <= v.ts THEN 0 ELSE 1 END AS dir,
         ROW_NUMBER() OVER (
           PARTITION BY v.event_id
           ORDER BY ABS(p.ts - v.ts),
                    CASE WHEN p.ts <= v.ts THEN 0 ELSE 1 END,
                    CASE WHEN p.ts <= v.ts THEN -p.event_id ELSE p.event_id END
         ) AS rn
  FROM v JOIN p ON p.user_id = v.user_id
  WHERE ABS(p.ts - v.ts) <= CAST(21600 AS BIGINT) * 1000000),
best AS (SELECT user_id, vid, pid, dist FROM cand WHERE rn = 1),
lv AS (
  SELECT v.user_id, v.event_id, b.pid, b.dist
  FROM v LEFT JOIN best b ON b.vid = v.event_id)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_views,
       CAST(SUM(CASE WHEN pid IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
       CAST(COALESCE(SUM(dist // 1000), 0) AS BIGINT) AS sum_dist_ms,
       CAST(COALESCE(SUM(pid), 0) AS BIGINT) AS match_checksum
FROM lv GROUP BY 1
"""


@register("x_asof_nearest_join", oracle=_ASOF_NEAREST_SQL, tags=("J9", "W3"), doc="")
def x_asof_nearest_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join, NEAREST direction with tolerance (pandas
    merge_asof(direction='nearest') — J9 covers backward only): each
    view event attaches the purchase minimizing |Δts| within the same
    user and a 6-hour bound; ties prefer backward, then deterministic id
    order. `operators/joins.py::asof_nearest` runs it as TWO running-
    carry windows over one tag-union (backward = ascending traversal,
    forward = the same union descending) — one exchange on the key,
    work per key LINEAR in events, never the candidate-quadratic range
    join the oracle uses (the oracle's all-pairs form is the spec, not
    the plan). Sensor fusion, click-attribution, and AV-frame alignment
    are all this exact operator. Distances compared in integer
    microseconds — no float anywhere."""
    from ..operators.joins import asof_nearest

    e = T(spark, sf_dir, "events").withColumn("ts_us", F.unix_micros("ts"))
    v = e.filter(F.col("event_type") == "view").select("event_id", "user_id", "ts_us")
    p = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_us", "value"
    )
    matched = asof_nearest(
        v,
        p,
        on=["user_id"],
        left_ts="ts_us",
        right_ts="ts_us",
        right_id="event_id",
        right_cols=["value"],
        tolerance=6 * 3600 * 1_000_000,
    )
    return matched.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_views"),
        F.sum(F.col("event_id_asof").isNotNull().cast("int"))
        .cast("long")
        .alias("n_matched"),
        F.coalesce(F.sum((F.col("asof_dist") / 1000).cast("long")), F.lit(0))
        .cast("long")
        .alias("sum_dist_ms"),
        F.coalesce(F.sum("event_id_asof"), F.lit(0)).cast("long").alias("match_checksum"),
    )


_OBSERVE_SQL = f"""
SELECT o_orderpriority AS priority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       {sql_dsum("o_totalprice", scale=2)} AS revenue
FROM orders
WHERE o_totalprice > 0
GROUP BY 1
"""


@register("x_observe_metrics", oracle=_OBSERVE_SQL, tags=("A6", "DQ"), doc="")
def x_observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`DataFrame.observe()` — Spark's in-flight metrics channel (the
    AccumulatorV2 surface behind Delta Live Tables expectations and
    production write-audit counters): named aggregates ride THE SAME
    pass as the real query — row count, revenue total, and a violation
    counter here — costing zero extra scans, where a separate audit
    query would re-read 100 TB. In-query asserts prove the observed
    values equal an independently recomputed aggregate (count, decimal
    revenue, zero negatives) and that the contract fires: the
    observation is only readable AFTER an action. Output is the pruned
    aggregate itself, oracle-recomputed relationally — observe() must
    never perturb the plan it rides."""
    from pyspark.sql import Observation

    o = T(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    obs = Observation("dq")
    observed = o.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("o_totalprice").cast("decimal(25,4)")).alias("rev"),
        F.sum((F.col("o_totalprice") < 0).cast("int")).alias("n_negative"),
    )
    res = observed.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice", scale=2).alias("revenue"),
    )
    rows = res.collect()  # the action that materializes the observation
    m = obs.get
    chk = o.agg(
        F.count(F.lit(1)), F.sum(F.col("o_totalprice").cast("decimal(25,4)"))
    ).first()
    assert m["n_rows"] == chk[0], (m, chk)
    assert m["rev"] == chk[1], (m, chk)
    assert m["n_negative"] == 0, m
    assert sum(r.n_orders for r in rows) == m["n_rows"]
    return res


_GAPFILL_SQL = f"""
WITH span AS (
  SELECT CAST(MIN(o_orderdate) AS DATE) AS d0, CAST(MAX(o_orderdate) AS DATE) AS d1
  FROM orders),
cal AS (
  SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day FROM span),
daily AS (
  SELECT o_orderpriority AS priority, CAST(o_orderdate AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         {sql_dsum("o_totalprice", scale=2)} AS revenue
  FROM orders GROUP BY 1, 2),
grid AS (
  SELECT p.priority, c.day, d.n_orders, d.revenue
  FROM (SELECT DISTINCT priority FROM daily) p
  CROSS JOIN cal c
  LEFT JOIN daily d ON d.priority = p.priority AND d.day = c.day),
filled AS (
  SELECT priority, day,
         COALESCE(n_orders, 0) AS n_orders,
         CASE WHEN n_orders IS NULL THEN 1 ELSE 0 END AS is_gap,
         COALESCE(LAST_VALUE(revenue IGNORE NULLS) OVER (
           PARTITION BY priority ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0) AS revenue_ffill
  FROM grid)
SELECT priority,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(SUM(is_gap) AS BIGINT) AS n_gap_days,
       CAST(SUM(n_orders) AS BIGINT) AS n_orders,
       CAST(ROUND(SUM(CAST(revenue_ffill AS DECIMAL(25,2))), 2) AS DOUBLE) AS ffill_mass
FROM filled GROUP BY 1
"""


@register("x_timeseries_gapfill", oracle=_GAPFILL_SQL, tags=("W3", "F2", "J3"), doc="")
def x_timeseries_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series GAP FILL + forward fill (pandas `resample().ffill()`,
    TimescaleDB `time_bucket_gapfill` + `locf`): the daily revenue
    series per priority is re-gridded onto the complete calendar —
    missing days materialize as rows (zero-filled counts) and the
    last-observation-carried-forward revenue closes the gaps, which is
    what every downstream window/forecast op needs (a rangeBetween
    frame tolerates gaps; a LSTM feature matrix does not). Shape: the
    calendar is one `sequence()` explode off a 2-scalar span (a few
    thousand rows — BROADCAST side), cross-joined to the small priority
    dim, left-joined to the daily aggregate, then ONE running
    `last(ignorenulls)` window per key — at 100 TB the grid is
    keys × days, orders of magnitude smaller than the fact table it
    summarizes. ffill_mass (the decimal-summed filled series) pins the
    fill VALUES, not just the gap count, cross-engine."""
    o = T(spark, sf_dir, "orders")
    d0, d1 = o.agg(
        F.min(F.col("o_orderdate").cast("date")), F.max(F.col("o_orderdate").cast("date"))
    ).first()
    cal = spark.range(1).select(
        F.explode(F.sequence(F.lit(d0), F.lit(d1), F.expr("interval 1 day"))).alias("day")
    )
    daily = o.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderdate").cast("date").alias("day"),
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice", scale=2).alias("revenue"),
    )
    grid = (
        daily.select("priority").distinct()
        .crossJoin(F.broadcast(cal))
        .join(daily, ["priority", "day"], "left")
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("priority")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = grid.select(
        "priority",
        "day",
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.col("n_orders").isNull().cast("int").alias("is_gap"),
        F.coalesce(F.last("revenue", ignorenulls=True).over(w), F.lit(0.0)).alias(
            "revenue_ffill"
        ),
    )
    return filled.groupBy("priority").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("is_gap").cast("long").alias("n_gap_days"),
        F.sum("n_orders").cast("long").alias("n_orders"),
        F.round(F.sum(F.col("revenue_ffill").cast("decimal(25,2)")), 2)
        .cast("double")
        .alias("ffill_mass"),
    )


_REPLACE_RANGE_SQL = f"""
WITH bounds AS (SELECT MAX(o_orderkey) AS mx FROM orders),
replaced AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice + 1000.0 AS o_totalprice,
         'URGENT' AS o_orderpriority
  FROM orders, bounds
  WHERE o_orderkey BETWEEN mx // 4 AND mx // 2),
final AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
  FROM orders, bounds WHERE o_orderkey NOT BETWEEN mx // 4 AND mx // 2
  UNION ALL SELECT * FROM replaced)
SELECT o_orderpriority AS priority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       {sql_dsum("o_totalprice", scale=2)} AS revenue
FROM final GROUP BY 1
"""


@register("x_replace_range_incremental", oracle=_REPLACE_RANGE_SQL, tags=("S7", "S3", "P4"), doc="")
def x_replace_range_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL replaceWhere — `VersionedTable.overwrite_range` (r11):
    the idempotent-backfill primitive done at the cost of the backfill,
    not the table. On a range-clustered snapshot, replacing the
    [max/4, max/2] key window rewrites ONLY the files whose manifest
    [min,max] overlaps it (asserted: carried > 0 AND rewritten <
    total — the O(affected) contract `overwrite_where`'s materializing
    form can't make); the commit is file-granular like optimize, and a
    stray replacement row outside the window raises (asserted). The
    oracle rebuilds the final state relationally (untouched slice UNION
    corrected slice), so the hash proves replace-exactly-this-window —
    no row leaked, lost, or double-written across the file boundary
    where retained rows and replacements meet."""
    import tempfile

    from ..sources.table_format import VersionedTable

    o = T(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"
    )
    mx = o.agg(F.max("o_orderkey")).first()[0]
    lo, hi = mx // 4, mx // 2
    t = VersionedTable(spark, tempfile.mkdtemp(prefix="rdl_rrange_"))
    t.overwrite(o, cluster_by=["o_orderkey"], cluster_files=8)

    fixed = o.filter(F.col("o_orderkey").between(lo, hi)).select(
        "o_orderkey",
        "o_orderstatus",
        (F.col("o_totalprice") + 1000.0).alias("o_totalprice"),
        F.lit("URGENT").alias("o_orderpriority"),
    )
    stray = o.filter(F.col("o_orderkey") > hi).limit(1)  # deterministically outside
    try:
        t.overwrite_range("o_orderkey", lo, hi, stray)
        raise AssertionError("stray replacement row accepted")
    except ValueError:
        pass
    r = t.overwrite_range("o_orderkey", lo, hi, fixed, rows_per_file=max(200, o.count() // 8))
    assert r["carried"] > 0 and 0 < r["rewritten"] < r["rewritten"] + r["carried"], r
    assert t._manifest(r["version"])["file_granular"] is True
    return t.read().groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice", scale=2).alias("revenue"),
    )


_OVERLAP_SQL = """
WITH iv AS (
  SELECT o.o_orderpriority AS priority,
         CAST(o.o_orderdate AS DATE) AS d0,
         CAST(l.l_shipdate AS DATE) AS d1
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE CAST(l.l_shipdate AS DATE) >= CAST(o.o_orderdate AS DATE)),
ev AS (
  SELECT priority, d0 AS day, 1 AS net FROM iv
  UNION ALL
  SELECT priority, d1 + 1, -1 FROM iv),
daily AS (
  SELECT priority, day, CAST(SUM(net) AS BIGINT) AS net
  FROM ev GROUP BY 1, 2),
conc AS (
  SELECT priority, day,
         CAST(SUM(net) OVER (PARTITION BY priority ORDER BY day) AS BIGINT) AS c
  FROM daily),
mx AS (
  SELECT priority, day, c, MAX(c) OVER (PARTITION BY priority) AS mc FROM conc),
tot AS (
  SELECT priority, COUNT(*) AS n_open FROM iv GROUP BY 1)
SELECT m.priority,
       CAST(t.n_open AS BIGINT) AS n_open,
       CAST(m.mc AS BIGINT) AS max_concurrent,
       MIN(m.day) AS peak_day
FROM mx m JOIN tot t ON t.priority = m.priority
WHERE m.c = m.mc
GROUP BY 1, 2, 3
"""


@register("x_interval_overlap", oracle=_OVERLAP_SQL, tags=("W3", "J8", "A1"), doc="")
def x_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max-concurrent-intervals (warehouse load / open-fulfillment
    backlog — the `range agg` every ops dashboard needs): how many
    line items are simultaneously awaiting shipment per order priority
    (open from o_orderdate until l_shipdate), and on which day the
    peak occurs. The textbook formulation is an interval SELF-JOIN
    (`a.start <= b.end AND b.start <= a.end`) — O(n²) pairs, dead at
    100 TB. This is the sweep-line decomposition instead: each interval
    becomes a +1 event at its start day and a -1 event the day after
    its end, events collapse to ONE row per (priority, day) in a
    partial-aggregated groupBy (map-side combine — the only pass over
    the fact join), and the running SUM window walks the tiny
    (priorities x days) daily grid, never the facts. Peak day is the
    MIN day attaining the per-priority max: a total order, so the
    answer is deterministic cross-engine. At 100 TB the grid is
    ~5 priorities x ~2.5k days regardless of fact cardinality — the
    concurrency query costs one co-partitioned fact join + one
    broadcast-size window, not a quadratic self-join."""
    li = T(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.col("l_shipdate").cast("date").alias("d1")
    )
    o = T(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"),
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderdate").cast("date").alias("d0"),
    )
    iv = li.join(o, "l_orderkey").filter(F.col("d1") >= F.col("d0"))
    starts = iv.select("priority", F.col("d0").alias("day"), F.lit(1).alias("net"))
    ends = iv.select("priority", F.date_add("d1", 1).alias("day"), F.lit(-1).alias("net"))
    daily = starts.unionAll(ends).groupBy("priority", "day").agg(
        F.sum("net").cast("bigint").alias("net")
    )
    conc = daily.select(
        "priority",
        "day",
        F.sum("net")
        .over(Window.partitionBy("priority").orderBy("day"))
        .cast("bigint")
        .alias("c"),
    )
    mx = conc.withColumn("mc", F.max("c").over(Window.partitionBy("priority")))
    tot = iv.groupBy("priority").agg(F.count(F.lit(1)).alias("n_open"))
    return (
        mx.filter(F.col("c") == F.col("mc"))
        .join(tot, "priority")
        .groupBy(
            "priority",
            F.col("n_open"),
            F.col("mc").cast("bigint").alias("max_concurrent"),
        )
        .agg(F.min("day").alias("peak_day"))
    )


_OLS_SQL = """
WITH s AS (
  SELECT l_returnflag AS flag,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(25,2))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,2))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(30,4))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(30,4))) AS DOUBLE) AS syy,
         CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(30,4))) AS DOUBLE) AS sxy
  FROM lineitem GROUP BY 1)
SELECT flag,
       CAST(n AS BIGINT) AS n,
       CAST(FLOOR(1e6 * (n * sxy - sx * sy) / (n * sxx - sx * sx)) AS BIGINT) AS slope_e6,
       CAST(FLOOR(1e6 * (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n) AS BIGINT)
         AS intercept_e6,
       CAST(FLOOR(1e6 * ((n * sxy - sx * sy) * (n * sxy - sx * sy))
                  / ((n * sxx - sx * sx) * (n * syy - sy * sy))) AS BIGINT) AS r2_e6
FROM s
"""


@register("x_linear_regression", oracle=_OLS_SQL, tags=("A1", "F3", "ML"), doc="")
def x_linear_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed ordinary least squares (SQL `REGR_SLOPE` /
    `REGR_INTERCEPT` / `REGR_R2`, scikit-learn `LinearRegression` —
    price-vs-quantity fit per return flag) via SUFFICIENT STATISTICS:
    the model reduces to five sums (n, Σx, Σy, Σx², Σxy [, Σy² for R²])
    that merge associatively, so ONE partial-aggregated groupBy pass
    computes them map-side and the closed form runs on the 3-row
    result — no MLlib, no gradient iterations, no driver-side data.
    This is how regression survives 100 TB: the shuffle carries 6
    numbers per group, never rows. Cross-engine determinism: inputs
    are 2-decimal, so every per-row product has <= 4 decimals and
    `CAST(x*y AS DECIMAL(30,4))` is EXACT on both engines (the
    guard-digit rule); the decimal sums cast back to identical doubles
    and the closed-form arithmetic is per-value IEEE, so the
    `floor(1e6*v)` quantization (the f3 pattern) can never straddle.
    Native `F.regr_slope` exists but computes streaming covariances
    whose partial-merge order differs from DuckDB's sequential sum —
    the sufficient-statistics form is the deterministic equivalent."""
    li = T(spark, sf_dir, "lineitem")
    s = li.groupBy(F.col("l_returnflag").alias("flag")).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(25,2)")).cast("double").alias("sx"),
        F.sum(F.col("l_extendedprice").cast("decimal(25,2)")).cast("double").alias("sy"),
        F.sum((F.col("l_quantity") * F.col("l_quantity")).cast("decimal(30,4)"))
        .cast("double")
        .alias("sxx"),
        F.sum((F.col("l_extendedprice") * F.col("l_extendedprice")).cast("decimal(30,4)"))
        .cast("double")
        .alias("syy"),
        F.sum((F.col("l_quantity") * F.col("l_extendedprice")).cast("decimal(30,4)"))
        .cast("double")
        .alias("sxy"),
    )
    cov = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    varx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    slope = cov / varx
    return s.select(
        "flag",
        F.col("n").cast("bigint").alias("n"),
        F.floor(F.lit(1e6) * slope).cast("bigint").alias("slope_e6"),
        F.floor(F.lit(1e6) * (F.col("sy") - slope * F.col("sx")) / F.col("n"))
        .cast("bigint")
        .alias("intercept_e6"),
        F.floor(F.lit(1e6) * (cov * cov) / (varx * vary)).cast("bigint").alias("r2_e6"),
    )


_TWA_SQL = """
WITH daily AS (
  SELECT o_orderpriority AS priority, CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(25,2))) AS DOUBLE) AS rev
  FROM orders GROUP BY 1, 2),
weighted AS (
  SELECT priority, day, rev,
         CAST(LEAD(day) OVER (PARTITION BY priority ORDER BY day) - day AS BIGINT) AS w
  FROM daily)
SELECT priority,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(SUM(w) AS BIGINT) AS span_days,
       CAST(SUM(CAST(rev * w AS DECIMAL(30,2))) AS DOUBLE)
         / CAST(SUM(w) AS DOUBLE) AS tw_avg_revenue
FROM weighted
WHERE w IS NOT NULL
GROUP BY 1
"""


@register("x_time_weighted_avg", oracle=_TWA_SQL, tags=("W2", "F2", "A1"), doc="")
def x_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average over an IRREGULAR series (TimescaleDB
    `time_weight('locf', ...)`, pandas `resample().mean()` without the
    re-grid): each observed daily revenue holds until the NEXT
    observation, so its weight is the gap length in days — the honest
    mean of a series with holes, where the arithmetic mean over-weights
    dense stretches. Shape: the fact table collapses to a (priority x
    day) daily aggregate in one partial-aggregated pass (the only scan),
    then ONE lead() window on the tiny grid assigns each point its
    holding duration; numerator and denominator are exact decimal sums.
    Determinism: daily revenue is a decimal sum (exact, identical
    doubles on both engines); rev * integer-days has 2 decimals, so
    `CAST(rev*w AS DECIMAL(30,2))` is exact on both engines; the final
    division runs on identical doubles. At 100 TB the window never
    touches the fact table — it walks keys x days rows."""
    o = T(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderdate").cast("date").alias("day"),
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(25,2)")).cast("double").alias("rev"))
    w = F.datediff(
        F.lead("day").over(Window.partitionBy("priority").orderBy("day")), F.col("day")
    ).cast("bigint")
    weighted = daily.select("priority", "day", "rev", w.alias("w")).filter(
        F.col("w").isNotNull()
    )
    return weighted.groupBy("priority").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("w").cast("bigint").alias("span_days"),
        (
            F.sum((F.col("rev") * F.col("w")).cast("decimal(30,2)")).cast("double")
            / F.sum("w").cast("double")
        ).alias("tw_avg_revenue"),
    )


_BITEMPORAL_SQL = """
WITH legs AS (
  SELECT 'v1' AS txn, DATE '1996-01-01' AS business_date,
         c_mktsegment AS segment, c_acctbal FROM customer
  UNION ALL
  SELECT 'v1', DATE '1997-01-01', c_mktsegment, c_acctbal FROM customer
  UNION ALL
  SELECT 'v2', DATE '1996-01-01', c_mktsegment, c_acctbal FROM customer
  UNION ALL
  SELECT 'v2', DATE '1997-01-01',
         CASE WHEN c_custkey % 7 = 0 THEN 'RELOCATED' ELSE c_mktsegment END,
         c_acctbal
  FROM customer)
SELECT txn, business_date, segment,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(25,2))), 2) AS DOUBLE) AS balance
FROM legs
GROUP BY 1, 2, 3
"""


@register("x_bitemporal_asof", oracle=_BITEMPORAL_SQL, tags=("S7", "W2"), doc="")
def x_bitemporal_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BITEMPORAL as-of (SQL:2011 system+application time, XTDB/
    Snowflake 'what did we believe on date T about business date B'):
    an SCD2 dimension carries BUSINESS validity intervals
    (valid_from/valid_to), and the versioned table carries TRANSACTION
    time — each commit is what the warehouse believed then. A
    relocation correction lands as commit v2 (closing the old interval
    at 1996-06-01 and opening a 'RELOCATED' one), and the query answers
    the full 2x2: {as recorded at v1, v2} x {business date 1996-01-01,
    1997-01-01}. At v1 both dates see the original segments (the
    correction hadn't been recorded); at v2, date B1 still sees the old
    segment (interval containment — the change is effective later) and
    B2 sees the relocation. Shape: `read_version` resolves each
    transaction-time leg from the manifest (no log replay), business
    time is one interval-containment filter per leg, and the four legs
    union into a single aggregate — time travel costs metadata, never a
    second copy of the data. Oracle recomputes each leg's expected
    state relationally from the raw customer table."""
    import tempfile

    from ..sources.table_format import VersionedTable

    c = T(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment", "c_acctbal")
    far = F.lit("9999-12-31").cast("date")
    eff = F.lit("1996-06-01").cast("date")
    scd1 = c.select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        "c_acctbal",
        F.lit("1995-01-01").cast("date").alias("valid_from"),
        far.alias("valid_to"),
    )
    t = VersionedTable(spark, tempfile.mkdtemp(prefix="rdl_bitemporal_"))
    t.overwrite(scd1)  # transaction time v1: the original belief
    moved = F.col("c_custkey") % 7 == 0
    scd2 = (
        scd1.withColumn("valid_to", F.when(moved, eff).otherwise(F.col("valid_to")))
        .unionByName(
            scd1.filter(moved).select(
                "c_custkey",
                F.lit("RELOCATED").alias("segment"),
                "c_acctbal",
                eff.alias("valid_from"),
                far.alias("valid_to"),
            )
        )
    )
    t.overwrite(scd2)  # transaction time v2: the correction, recorded later
    vs = sorted(t._versions())
    legs = []
    for label, ver in (("v1", vs[0]), ("v2", vs[-1])):
        snap = t.read_version(ver)
        for b in ("1996-01-01", "1997-01-01"):
            bd = F.lit(b).cast("date")
            legs.append(
                snap.filter((F.col("valid_from") <= bd) & (bd < F.col("valid_to"))).select(
                    F.lit(label).alias("txn"),
                    bd.alias("business_date"),
                    "segment",
                    "c_acctbal",
                )
            )
    u = legs[0]
    for df in legs[1:]:
        u = u.unionByName(df)
    return u.groupBy("txn", "business_date", "segment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        dsum("c_acctbal", scale=2).alias("balance"),
    )


_COALESCE_IV_SQL = """
WITH iv AS (
  SELECT o.o_orderpriority AS priority,
         CAST(o.o_orderdate AS DATE) AS d0,
         CAST(l.l_shipdate AS DATE) AS d1
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE CAST(l.l_shipdate AS DATE) >= CAST(o.o_orderdate AS DATE)),
marked AS (
  SELECT priority, d0, d1,
         CASE WHEN d0 > MAX(d1) OVER (
                PARTITION BY priority ORDER BY d0, d1
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS new_span
  FROM iv),
islands AS (
  SELECT priority, d0, d1,
         SUM(new_span) OVER (PARTITION BY priority ORDER BY d0, d1
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span_id
  FROM marked),
spans AS (
  SELECT priority, span_id, MIN(d0) AS s0, MAX(d1) AS s1,
         COUNT(*) AS n_merged
  FROM islands GROUP BY 1, 2)
SELECT priority,
       CAST(COUNT(*) AS BIGINT) AS n_spans,
       CAST(SUM(CAST(s1 - s0 AS BIGINT) + 1) AS BIGINT) AS covered_days,
       CAST(MAX(CAST(s1 - s0 AS BIGINT) + 1) AS BIGINT) AS longest_span_days,
       CAST(MAX(n_merged) AS BIGINT) AS max_merged
FROM spans GROUP BY 1
"""


@register("x_interval_coalesce", oracle=_COALESCE_IV_SQL, tags=("W3", "J8"), doc="")
def x_interval_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval COALESCING (range_agg / temporal normalization — merge
    overlapping validity intervals into maximal covered spans): the
    dual of x_interval_overlap, and the normalization step every
    temporal table needs before interval joins stay sane. Overlap
    detection by pairwise comparison is O(n²); the gaps-and-islands
    form is one sort: an interval starts a NEW span iff its start
    exceeds the running MAX of all previous ends (ROWS ... 1 PRECEDING
    window), the running SUM of those flags names each island, and a
    groupBy collapses islands to spans. Keyed by priority, ordered by
    (d0, d1) — a total order, so island ids are deterministic
    cross-engine. At 100 TB each key's intervals sort within its
    partition (one shuffle, no joins); the span count per key is tiny.
    Cf. PostgreSQL 14 `range_agg`, SQL:2011 temporal normalization."""
    li = T(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.col("l_shipdate").cast("date").alias("d1")
    )
    o = T(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"),
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderdate").cast("date").alias("d0"),
    )
    iv = li.join(o, "l_orderkey").filter(F.col("d1") >= F.col("d0")).select(
        "priority", "d0", "d1"
    )
    w = Window.partitionBy("priority").orderBy("d0", "d1")
    prev_max_end = F.max("d1").over(w.rowsBetween(Window.unboundedPreceding, -1))
    marked = iv.withColumn(
        "new_span",
        F.when(F.col("d0") > prev_max_end, F.lit(1)).otherwise(F.lit(0)),
    )
    islands = marked.withColumn(
        "span_id", F.sum("new_span").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    spans = islands.groupBy("priority", "span_id").agg(
        F.min("d0").alias("s0"), F.max("d1").alias("s1"), F.count(F.lit(1)).alias("n_merged")
    )
    span_days = (F.datediff("s1", "s0") + F.lit(1)).cast("bigint")
    return spans.groupBy("priority").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(span_days).cast("bigint").alias("covered_days"),
        F.max(span_days).cast("bigint").alias("longest_span_days"),
        F.max("n_merged").cast("bigint").alias("max_merged"),
    )


_MERGE_EVOLVE_SQL = """
WITH eff AS (
  SELECT o_orderkey AS k,
         CASE WHEN o_orderkey < 6000 AND o_orderkey % 5 = 0
              THEN o_totalprice + 100.0
              ELSE o_totalprice END AS price,
         CASE WHEN o_orderkey >= 6000 THEN 'LATE'
              WHEN o_orderkey % 5 = 0 THEN 'CORRECTED'
              ELSE 'ORIGINAL' END AS channel
  FROM orders WHERE o_orderkey < 7000)
SELECT channel,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(ROUND(SUM(CAST(price AS DECIMAL(25,2))), 2) AS DOUBLE) AS revenue
FROM eff GROUP BY 1
"""


@register("x_merge_evolution", oracle=_MERGE_EVOLVE_SQL, tags=("S7", "S6"), doc="")
def x_merge_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE with schema AUTO-EVOLUTION (Delta's
    `spark.databricks.delta.schema.autoMerge`): the CDC source gained a
    column (`channel`) the target table has never seen — the merge
    must evolve the table schema in the SAME commit, with existing
    unmatched rows taking NULL, instead of forcing a separate DDL +
    backfill. Here the correction batch updates matched keys (price
    +100, channel=CORRECTED) and inserts late orders (channel=LATE) in
    one merge; untouched rows read back with channel NULL, reported as
    ORIGINAL. Contract edges pinned in-query: the SAME merge without
    merge_schema raises (no silent evolution), and a source MISSING a
    target column raises rather than nulling it out under replace-row
    semantics (the partial-update footgun). At scale this is one
    anti-join + union commit — evolution costs a projection, not a
    table rewrite. Cf. append's merge_schema (x_schema_evolution) for
    the append-path version; x_type_widening for type changes."""
    import tempfile

    from ..sources.table_format import VersionedTable

    o = T(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("price"),
    )
    t = VersionedTable(spark, tempfile.mkdtemp(prefix="rdl_mergevo_"))
    t.overwrite(o.filter(F.col("k") < 6000))
    corrections = o.filter((F.col("k") < 6000) & (F.col("k") % 5 == 0)).select(
        "k", "status", (F.col("price") + 100.0).alias("price"),
        F.lit("CORRECTED").alias("channel"),
    )
    late = o.filter((F.col("k") >= 6000) & (F.col("k") < 7000)).select(
        "k", "status", "price", F.lit("LATE").alias("channel")
    )
    updates = corrections.unionByName(late)
    try:
        t.merge(updates, ["k"])  # no evolution flag -> must refuse
        raise AssertionError("schema drift merged silently")
    except Exception as e:  # noqa: BLE001
        assert not isinstance(e, AssertionError), e
    try:
        t.merge(updates.drop("status"), ["k"], merge_schema=True)
        raise AssertionError("source missing target column was accepted")
    except ValueError:
        pass
    t.merge(updates, ["k"], merge_schema=True)
    return (
        t.read()
        .select(F.coalesce(F.col("channel"), F.lit("ORIGINAL")).alias("channel"), "price")
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            dsum("price", scale=2).alias("revenue"),
        )
    )


_BITMAP_INTERSECT_SQL = """
WITH u AS (SELECT DISTINCT event_type AS t, user_id AS uid FROM events),
cnt AS (SELECT t, COUNT(*) AS n FROM u GROUP BY 1),
pairs AS (
  SELECT a.t AS ta, a.n AS na, b.t AS tb, b.n AS nb
  FROM cnt a JOIN cnt b ON a.t < b.t),
onboth AS (
  SELECT x.t AS ta, y.t AS tb, COUNT(*) AS n_both
  FROM u x JOIN u y ON x.uid = y.uid AND x.t < y.t
  GROUP BY 1, 2)
SELECT p.ta AS type_a, p.tb AS type_b,
       CAST(p.na AS BIGINT) AS n_a,
       CAST(p.nb AS BIGINT) AS n_b,
       CAST(COALESCE(o.n_both, 0) AS BIGINT) AS n_both,
       CAST(FLOOR(1000000.0 * COALESCE(o.n_both, 0)
                  / (p.na + p.nb - COALESCE(o.n_both, 0))) AS BIGINT) AS jaccard_e6
FROM pairs p LEFT JOIN onboth o ON o.ta = p.ta AND o.tb = p.tb
"""


@register("x_bitmap_intersect", oracle=_BITMAP_INTERSECT_SQL, tags=("A2", "F3"), doc="")
def x_bitmap_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience OVERLAP via bitmap INTERSECTION (the bitmap set-algebra
    leg x_bitmap_distinct's union/rollup leg leaves open — Druid's
    `bitmapAnd`, ClickHouse `bitmapAndCardinality`): which user
    segments co-occur, exactly, without ever re-shuffling raw events.
    Each event type's audience is a set of 64-bit words (bit_or over
    user bits — one scan, the same stored partials the distinct-count
    mart keeps); the overlap of two audiences is popcount(word_a AND
    word_b) summed over the word index — an equi-join on word_idx
    between 5 tiny bitmap tables, never a self-join of events (the
    oracle DOES pay that quadratic self-join — on the engine side it
    exists only to prove the bit math right). Jaccard affinity ships
    floor-quantized. At 100 TB: intersections/unions/differences of any
    segment pair stay O(id-space/64) word ops on stored partials —
    the audience-overlap matrix costs seconds, not a fact-table pass."""
    from ..catalog import load_table

    e = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    words = e.select(
        F.col("event_type").alias("t"),
        (F.col("user_id") / 64).cast("long").alias("word_idx"),
        F.expr("shiftleft(1L, CAST(user_id % 64 AS INT))").alias("bit"),
    )
    bm = words.groupBy("t", "word_idx").agg(F.bit_or("bit").alias("word"))
    cnt = bm.groupBy("t").agg(F.sum(F.bit_count("word")).cast("bigint").alias("n"))
    a, b2 = [df for df in (bm.alias("a"), bm.alias("b"))]
    inter = (
        a.join(
            b2,
            (F.col("a.word_idx") == F.col("b.word_idx")) & (F.col("a.t") < F.col("b.t")),
        )
        .select(
            F.col("a.t").alias("ta"),
            F.col("b.t").alias("tb"),
            F.bit_count(F.col("a.word").bitwiseAND(F.col("b.word"))).alias("pc"),
        )
        .groupBy("ta", "tb")
        .agg(F.sum("pc").cast("bigint").alias("n_both"))
    )
    ca, cb = cnt.alias("ca"), cnt.alias("cb")
    pairs = ca.join(cb, F.col("ca.t") < F.col("cb.t")).select(
        F.col("ca.t").alias("ta"),
        F.col("ca.n").alias("na"),
        F.col("cb.t").alias("tb"),
        F.col("cb.n").alias("nb"),
    )
    out = pairs.join(inter, ["ta", "tb"], "left").select(
        F.col("ta").alias("type_a"),
        F.col("tb").alias("type_b"),
        F.col("na").alias("n_a"),
        F.col("nb").alias("n_b"),
        F.coalesce(F.col("n_both"), F.lit(0)).cast("bigint").alias("n_both"),
        F.floor(
            F.lit(1000000.0)
            * F.coalesce(F.col("n_both"), F.lit(0))
            / (F.col("na") + F.col("nb") - F.coalesce(F.col("n_both"), F.lit(0)))
        )
        .cast("bigint")
        .alias("jaccard_e6"),
    )
    return out


_CHI2_SQL = """
WITH obs AS (
  SELECT o_orderpriority AS p, o_orderstatus AS s, COUNT(*) AS o
  FROM orders GROUP BY 1, 2),
grid AS (
  SELECT pr.p, st.s, COALESCE(obs.o, 0) AS o
  FROM (SELECT DISTINCT o_orderpriority AS p FROM orders) pr
  CROSS JOIN (SELECT DISTINCT o_orderstatus AS s FROM orders) st
  LEFT JOIN obs ON obs.p = pr.p AND obs.s = st.s),
tot AS (
  SELECT p, s, o,
         CAST(SUM(o) OVER (PARTITION BY p) AS DOUBLE) AS rp,
         CAST(SUM(o) OVER (PARTITION BY s) AS DOUBLE) AS cs,
         CAST(SUM(o) OVER () AS DOUBLE) AS n
  FROM grid)
SELECT p AS priority,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(o) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(FLOOR(1000000.0 * (o - rp * cs / n) * (o - rp * cs / n)
                           / (rp * cs / n)) AS BIGINT)) AS BIGINT) AS chi2_mass_e6
FROM tot GROUP BY 1
"""


@register("x_chi_square_independence", oracle=_CHI2_SQL, tags=("A6", "F3"), doc="")
def x_chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square INDEPENDENCE test (Pearson's X² on the priority x
    status contingency table — the statistical backbone behind "did the
    experiment move the mix" and the drift checks x_psi_drift
    approximates distributionally): observed cell counts come from ONE
    partial-aggregated pass over the facts; expected counts
    E = row_total x col_total / N derive from window sums over the TINY
    aggregated grid (15 cells — including structurally-zero cells,
    which the naive groupBy silently drops and which still contribute E
    to the statistic: the grid cross-join materializes them). Per-cell
    X² contributions are floor-quantized to integers BEFORE summing, so
    shuffle-order float accumulation can never flip a digit
    cross-engine. At 100 TB the fact pass is the whole cost; the test
    itself runs on cells = |priorities| x |statuses| rows."""
    o = T(spark, sf_dir, "orders")
    obs = o.groupBy(
        F.col("o_orderpriority").alias("p"), F.col("o_orderstatus").alias("s")
    ).agg(F.count(F.lit(1)).alias("o"))
    pr = o.select(F.col("o_orderpriority").alias("p")).distinct()
    st = o.select(F.col("o_orderstatus").alias("s")).distinct()
    grid = pr.crossJoin(st).join(obs, ["p", "s"], "left").select(
        "p", "s", F.coalesce(F.col("o"), F.lit(0)).alias("o")
    )
    tot = grid.select(
        "p",
        "s",
        "o",
        F.sum("o").over(Window.partitionBy("p")).cast("double").alias("rp"),
        F.sum("o").over(Window.partitionBy("s")).cast("double").alias("cs"),
        F.sum("o").over(Window.partitionBy()).cast("double").alias("n"),
    )
    exp = F.col("rp") * F.col("cs") / F.col("n")
    contrib = F.floor(F.lit(1000000.0) * (F.col("o") - exp) * (F.col("o") - exp) / exp)
    return tot.groupBy(F.col("p").alias("priority")).agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.sum("o").cast("bigint").alias("n_orders"),
        F.sum(contrib.cast("bigint")).cast("bigint").alias("chi2_mass_e6"),
    )


_UNIQUE_SQL = """
WITH base AS (
  SELECT o_orderkey AS k, o_orderpriority AS priority, o_totalprice AS price
  FROM orders WHERE o_orderkey < 6000
  UNION ALL
  SELECT o_orderkey + 1000000, o_orderpriority, o_totalprice
  FROM orders WHERE o_orderkey >= 6000 AND o_orderkey < 7000)
SELECT priority,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT k) AS BIGINT) AS n_distinct_keys,
       CAST(ROUND(SUM(CAST(price AS DECIMAL(25,2))), 2) AS DOUBLE) AS revenue
FROM base GROUP BY 1
"""


@register("x_unique_constraint", oracle=_UNIQUE_SQL, tags=("S6", "S7"), doc="")
def x_unique_constraint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ENFORCED UNIQUE/PRIMARY KEY constraint (the gap between a
    warehouse and a lakehouse: Delta/Iceberg/Databricks PK constraints
    are INFORMATIONAL — duplicate keys silently land; here they
    cannot): after `add_unique("pk", ["k"])`, a commit that would
    publish duplicates aborts BEFORE the manifest links — both flavors
    are pinned in-query: a batch overlapping existing keys, and a batch
    with an internal duplicate (the case an anti-join-style pre-check
    misses). The failed commit leaves the table bit-identical (version
    asserted unchanged). A clean disjoint batch then lands, and MERGE
    remains legal on overlapping keys because it replaces rather than
    duplicates. Enforcement costs one key-columns-only shuffle per
    commit (O(keys), map-side-combined) — the honest price of a PK
    without an index; row-preserving ops skip it. The oracle recomputes
    the final relational state; n_distinct_keys == n_rows is the
    constraint made visible in the output."""
    import tempfile

    from ..sources.table_format import VersionedTable

    o = T(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderpriority").alias("priority"),
        F.col("o_totalprice").alias("price"),
    )
    t = VersionedTable(spark, tempfile.mkdtemp(prefix="rdl_unique_"))
    t.overwrite(o.filter(F.col("k") < 6000))
    t.add_unique("pk", ["k"])
    v_before = t.current_version()
    from ..sources.constraints import UniqueViolation

    try:  # overlap with existing keys -> abort
        t.append(o.filter(F.col("k") < 100))
        raise AssertionError("duplicate keys published under UNIQUE")
    except UniqueViolation:
        pass
    # scale-independent internal-dup probe: keys < 100 always exist
    dup_batch = o.filter(F.col("k") < 100).select(
        (F.col("k") + 2000000).alias("k"), "priority", "price"
    )
    try:  # batch-internal duplicate -> abort
        t.append(dup_batch.unionAll(dup_batch.limit(1)))
        raise AssertionError("batch-internal duplicate published under UNIQUE")
    except UniqueViolation:
        pass
    assert t.current_version() == v_before  # failed commits left no trace
    late = o.filter((F.col("k") >= 6000) & (F.col("k") < 7000)).select(
        (F.col("k") + 1000000).alias("k"), "priority", "price"
    )
    t.append(late)  # disjoint keys -> lands
    t.merge(o.filter(F.col("k") < 50), ["k"])  # replace, not duplicate -> legal
    return t.read().groupBy("priority").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("k").cast("bigint").alias("n_distinct_keys"),
        dsum("price", scale=2).alias("revenue"),
    )


_SAR_SQL = """
SELECT 'profile' AS section, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(25,2))), 2) AS DOUBLE) AS amount,
       CAST(SUM(c_custkey) AS BIGINT) AS key_checksum
FROM customer WHERE c_custkey = 7
UNION ALL
SELECT 'orders', CAST(COUNT(*) AS BIGINT),
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(25,2))), 2) AS DOUBLE),
       CAST(SUM(o_orderkey) AS BIGINT)
FROM orders WHERE o_custkey = 7
UNION ALL
SELECT 'lineitems', CAST(COUNT(*) AS BIGINT),
       CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(25,2))), 2) AS DOUBLE),
       CAST(SUM(l.l_orderkey) AS BIGINT)
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_custkey = 7
UNION ALL
SELECT 'events', CAST(COUNT(*) AS BIGINT),
       CAST(ROUND(SUM(CAST(COALESCE(value, 0) AS DECIMAL(25,2))), 2) AS DOUBLE),
       CAST(SUM(event_id) AS BIGINT)
FROM events WHERE user_id = 7
"""


@register("x_subject_access_report", oracle=_SAR_SQL, tags=("P4", "J2"), doc="")
def x_subject_access_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GDPR SUBJECT ACCESS REPORT (Art. 15 — "give me everything you
    hold about me"): one data subject's rows gathered across FOUR
    tables (profile, orders, their line items, their events) into a
    sectioned report. The compliance pair of x_vacuum_gdpr (erasure)
    and x_pseudonymize_join (minimization): access, erasure, and
    minimization are the three verbs a lakehouse owes every subject.
    Shape: each leg is a POINT LOOKUP — the subject-key predicate
    reaches the parquet scan as a pushed filter (plan-audited), so at
    100 TB each leg reads only row groups whose min/max straddle the
    key; on VersionedTable storage the same lookups ride the bloom
    sidecars (x_point_lookup_bloom) and file-skipping stats
    (x_file_skipping) instead of any full scan. The lineitem leg
    pushes the subject filter through a join — Catalyst turns it into
    a dynamic semi-join on the tiny matched-orders side. A SAR must be
    cheap, or it gets batched monthly; this one is O(matched rows)."""
    c = T(spark, sf_dir, "customer").filter(F.col("c_custkey") == 7)
    o = T(spark, sf_dir, "orders").filter(F.col("o_custkey") == 7)
    li = T(spark, sf_dir, "lineitem").join(
        F.broadcast(o.select("o_orderkey")),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    e = T(spark, sf_dir, "events").filter(F.col("user_id") == 7)

    def leg(df, name, amount_col, key_col):
        return df.agg(
            F.lit(name).alias("section"),
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum(F.col(amount_col).cast("decimal(25,2)")), 2)
            .cast("double")
            .alias("amount"),
            F.sum(key_col).cast("bigint").alias("key_checksum"),
        )
    legs = [
        leg(c, "profile", "c_acctbal", "c_custkey"),
        leg(o, "orders", "o_totalprice", "o_orderkey"),
        leg(li, "lineitems", "l_extendedprice", "l_orderkey"),
        leg(e.withColumn("v0", F.coalesce(F.col("value"), F.lit(0.0))), "events", "v0", "event_id"),
    ]
    out = legs[0]
    for df in legs[1:]:
        out = out.unionByName(df)
    return out


_CDC_SCD2_SQL = """
WITH base AS (
  SELECT c_custkey AS k, c_mktsegment AS seg FROM customer WHERE c_custkey < 2000),
st AS (
  SELECT k, seg,
         (k % 3 = 0) AS u2, (k % 5 = 0) AS u3, (k % 7 = 0) AS del
  FROM base),
rows_ AS (
  SELECT seg AS segment, (u2 OR u3 OR del) AS closed, k FROM st
  UNION ALL
  SELECT 'PROMO-A', (u3 OR del), k FROM st WHERE u2
  UNION ALL
  SELECT 'PROMO-B', del, k FROM st WHERE u3)
SELECT segment,
       CAST(COUNT(*) FILTER (WHERE NOT closed) AS BIGINT) AS n_current,
       CAST(COUNT(*) FILTER (WHERE closed) AS BIGINT) AS n_closed,
       CAST(COALESCE(SUM(k) FILTER (WHERE NOT closed), 0) AS BIGINT)
         AS current_key_checksum
FROM rows_ GROUP BY 1
"""


@register("x_cdc_scd2_apply", oracle=_CDC_SCD2_SQL, tags=("S7", "W2"), doc="")
def x_cdc_scd2_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC -> SCD2 dimension maintenance (the flagship mart pattern:
    a type-2 dimension maintained FROM a table's own change-data feed,
    Delta CDF -> dbt snapshot): the source dim commits an initial load,
    two promo reassignments (plain merges), and a churn delete — each
    with write-time CDF recording — and the SCD2 build consumes ONLY
    `changes_feed` deltas, never a snapshot diff. The apply is
    driver-loop-free: all per-version feeds union into one event log,
    insert/update_postimage events OPEN intervals, deletes TERMINATE,
    and a single lead() window per key assigns each interval its close
    version — O(|changes|) total, the property that makes nightly dim
    maintenance affordable at 100 TB (the alternative — diff two
    snapshots per night — reads the world twice). Preimages are
    deliberately skipped: the postimage chain IS the history. The
    oracle derives the expected interval inventory piecewise from the
    deterministic promo/churn rules."""
    import tempfile

    from ..sources.table_format import VersionedTable

    base = T(spark, sf_dir, "customer").filter(F.col("c_custkey") < 2000).select(
        F.col("c_custkey").alias("k"), F.col("c_mktsegment").alias("seg")
    )
    t = VersionedTable(
        spark, tempfile.mkdtemp(prefix="rdl_cdcscd2_"), record_cdf=True, cdf_keys=["k"]
    )
    t.append(base)                                                    # v1 initial load
    t.merge(base.filter(F.col("k") % 3 == 0).select("k", F.lit("PROMO-A").alias("seg")), ["k"])
    t.merge(base.filter(F.col("k") % 5 == 0).select("k", F.lit("PROMO-B").alias("seg")), ["k"])
    t.delete(F.col("k") % 7 == 0)                                     # v4 churn
    vs = sorted(t._versions())
    log = None
    for prev, v in zip([0, *vs[:-1]], vs):
        feed = t.changes_feed(prev, v).withColumn("v", F.lit(v))
        log = feed if log is None else log.unionByName(feed)
    events = log.filter(F.col("_change_type") != "update_preimage").select(
        "k",
        F.when(F.col("_change_type") == "delete", F.lit(None)).otherwise(F.col("seg")).alias("seg"),
        "v",
    )
    to_v = F.lead("v").over(Window.partitionBy("k").orderBy("v"))
    scd = events.withColumn("to_v", to_v).filter(F.col("seg").isNotNull())
    return scd.groupBy(F.col("seg").alias("segment")).agg(
        F.sum(F.col("to_v").isNull().cast("int")).cast("bigint").alias("n_current"),
        F.sum(F.col("to_v").isNotNull().cast("int")).cast("bigint").alias("n_closed"),
        F.coalesce(F.sum(F.when(F.col("to_v").isNull(), F.col("k"))), F.lit(0))
        .cast("bigint")
        .alias("current_key_checksum"),
    )


_DEFAULTS_SQL = """
WITH eff AS (
  SELECT o_orderkey AS k, o_totalprice AS price,
         CASE WHEN o_orderkey < 6000 THEN 'STORE'          -- backfill + fill
              WHEN o_orderkey < 7000 THEN 'WEB'            -- explicit value
              WHEN o_orderkey < 8000 THEN 'NONE'           -- explicit NULL stays NULL
              WHEN o_orderkey < 9000 THEN 'NONE'           -- post-drop absence -> NULL
         END AS channel
  FROM orders WHERE o_orderkey < 9000)
SELECT channel,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(k) AS BIGINT) AS key_checksum,
       CAST(ROUND(SUM(CAST(price AS DECIMAL(25,2))), 2) AS DOUBLE) AS revenue
FROM eff GROUP BY 1
"""


@register("x_default_columns", oracle=_DEFAULTS_SQL, tags=("S6", "S7"), doc="")
def x_default_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DEFAULT column values (Delta `ALTER TABLE ADD COLUMN ... DEFAULT`
    — the column-metadata trio's third leg beside GENERATED (computed,
    refuses explicit values) and IDENTITY (table-assigned)): after
    `add_default("channel", "'STORE'")`, a batch arriving WITHOUT the
    column takes the default at write time, a batch carrying an
    EXPLICIT value keeps it, and — the SQL-standard contract the naive
    read-side coalesce() gets wrong — an explicit NULL STAYS NULL: only
    absence fills. The add backfills existing rows in the same commit;
    `drop_default` restores absence -> NULL. Four batches walk all four
    behaviors, and the final aggregate hash-pins them against the
    oracle's piecewise CASE. At scale the fill is a write-side
    projection on the O(batch) AddFile path (pre-filled before the
    schema comparison, so defaulted tables keep incremental appends —
    same mechanism as generated columns)."""
    import tempfile

    from ..sources.table_format import VersionedTable

    o = T(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"), F.col("o_totalprice").alias("price")
    )
    t = VersionedTable(spark, tempfile.mkdtemp(prefix="rdl_defaults_"))
    t.overwrite(o.filter(F.col("k") < 5000))
    t.add_default("channel", "'STORE'")  # NEW column: backfill + future fill
    t.append(o.filter((F.col("k") >= 5000) & (F.col("k") < 6000)))  # absent -> STORE
    t.append(
        o.filter((F.col("k") >= 6000) & (F.col("k") < 7000)).withColumn(
            "channel", F.lit("WEB")
        )
    )  # explicit value kept
    t.append(
        o.filter((F.col("k") >= 7000) & (F.col("k") < 8000)).withColumn(
            "channel", F.lit(None).cast("string")
        )
    )  # explicit NULL stays NULL
    t.drop_default("channel")
    # absent -> NULL again; without the default the narrow batch needs
    # explicit schema-merge consent (absence is a drift once nothing
    # fills it — the append contract, unchanged)
    t.append(
        o.filter((F.col("k") >= 8000) & (F.col("k") < 9000)), merge_schema=True
    )
    return (
        t.read()
        .select(F.coalesce(F.col("channel"), F.lit("NONE")).alias("channel"), "k", "price")
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("k").cast("bigint").alias("key_checksum"),
            dsum("price", scale=2).alias("revenue"),
        )
    )


_COL_DRIFT_SQL = """
WITH touched AS (
  SELECT o_orderkey AS k,
         (o_orderkey % 3 = 0) AS price_chg,
         (o_orderkey % 5 = 0) AS status_chg
  FROM orders
  WHERE o_orderkey < 4000 AND (o_orderkey % 3 = 0 OR o_orderkey % 5 = 0))
SELECT col, n_changed, n_keys_touched FROM (
  SELECT 'price' AS col,
         CAST(COUNT(*) FILTER (WHERE price_chg) AS BIGINT) AS n_changed,
         CAST(COUNT(*) AS BIGINT) AS n_keys_touched
  FROM touched
  UNION ALL
  SELECT 'status',
         CAST(COUNT(*) FILTER (WHERE status_chg) AS BIGINT),
         CAST(COUNT(*) AS BIGINT)
  FROM touched
  UNION ALL
  SELECT 'priority', 0, CAST(COUNT(*) AS BIGINT) FROM touched)
"""


@register("x_column_drift_report", oracle=_COL_DRIFT_SQL, tags=("S7", "A6"), doc="")
def x_column_drift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COLUMN-level CDC analytics (which FIELDS are churning — the
    drill-down under every row-level change feed, and what schema/
    pipeline owners actually triage: 'the correction feed only ever
    touches price' is an invariant worth alerting on): the write-time
    CDF's pre/post images join per key and each column independently
    counts null-safe inequality — one pass over O(|changes|), columns
    compared in parallel as conditional aggregates, then unpivoted to
    one row per column. Pinned semantics: a merge that rewrites a row
    with IDENTICAL values nets out of the feed entirely (keys outside
    both rules never appear — n_keys_touched counts only real
    changes), and an untouched COLUMN on a touched row reports zero
    drift (priority = 0 for every touched key). The oracle derives the
    expected drift matrix piecewise from the correction rules."""
    import tempfile

    from ..sources.table_format import VersionedTable

    o = T(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("price"),
        F.col("o_orderpriority").alias("priority"),
    ).filter(F.col("k") < 4000)
    t = VersionedTable(
        spark, tempfile.mkdtemp(prefix="rdl_coldrift_"), record_cdf=True, cdf_keys=["k"]
    )
    t.append(o)
    v1 = t.current_version()
    updates = o.select(
        "k",
        F.when(F.col("k") % 5 == 0, F.lit("X")).otherwise(F.col("status")).alias("status"),
        F.when(F.col("k") % 3 == 0, F.col("price") + 10.0).otherwise(F.col("price")).alias("price"),
        "priority",
    )
    t.merge(updates, ["k"])
    feed = t.changes_feed(v1, t.current_version())
    pre = feed.filter(F.col("_change_type") == "update_preimage").select(
        "k", F.col("status").alias("p_status"), F.col("price").alias("p_price"),
        F.col("priority").alias("p_priority"),
    )
    post = feed.filter(F.col("_change_type") == "update_postimage").select(
        "k", "status", "price", "priority"
    )
    j = pre.join(post, "k")
    diff = lambda a, b: (~F.col(a).eqNullSafe(F.col(b))).cast("int")  # noqa: E731
    agg = j.agg(
        F.sum(diff("p_price", "price")).cast("bigint").alias("price"),
        F.sum(diff("p_status", "status")).cast("bigint").alias("status"),
        F.sum(diff("p_priority", "priority")).cast("bigint").alias("priority"),
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
    )
    return agg.select(
        F.explode(
            F.array(
                F.struct(F.lit("price").alias("col"), F.col("price").alias("n_changed")),
                F.struct(F.lit("status").alias("col"), F.col("status").alias("n_changed")),
                F.struct(F.lit("priority").alias("col"), F.col("priority").alias("n_changed")),
            )
        ).alias("s"),
        F.col("n_keys"),
    ).select(
        F.col("s.col").alias("col"),
        F.col("s.n_changed").alias("n_changed"),
        F.col("n_keys").alias("n_keys_touched"),
    )


_ICE_PART_SQL = f"""
SELECT o_orderpriority AS priority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_checksum,
       {sql_dsum("o_totalprice", scale=2)} AS revenue,
       CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT'
                THEN o_orderkey END) AS BIGINT) AS urgent_checksum
FROM orders
GROUP BY 1
"""


@register(
    "x_iceberg_partitioned_export", oracle=_ICE_PART_SQL, tags=("S3", "P4"), doc=""
)
def x_iceberg_partitioned_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg export of an identity-PARTITIONED table (r13 — removes
    the r12 scope guard): the hive `priority=X/` layout exports as a
    REAL partition spec (identity transform, source-id = the column's
    field id, partition field-ids from 1000 — the Iceberg numbering),
    and every data_file carries its partition values as METADATA (the
    Iceberg contract: identity values are never read from parquet —
    the file doesn't even contain the column). The reader half makes
    that contract literal: it reads files under the FILE schema and
    injects partition values as typed literals, and a partition_filter
    prunes the FILE LIST from metadata alone — the in-query assertion
    pins that the pruned read touched ONLY the matching partition's
    files (planning-time pruning, the P4 semantics on the interop
    surface). Aggregate runs on the re-imported table, with the
    urgent_checksum column recomputed from the PRUNED read — so the
    hash match proves both the full round-trip and the pruned leg;
    the DuckDB oracle recomputes from pristine orders."""
    import os as _os
    import tempfile

    from ..sources.iceberg_import import read_iceberg_snapshot
    from ..sources.table_format import VersionedTable

    o = T(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    t = VersionedTable(spark, tempfile.mkdtemp(prefix="rdl_ipart_"))
    t.overwrite(o, partition_by=["o_orderpriority"])
    t.export_iceberg_metadata()

    full = read_iceberg_snapshot(spark, t.path)
    pruned = read_iceberg_snapshot(
        spark, t.path, partition_filter={"o_orderpriority": "1-URGENT"}
    )
    # planning-time pruning: only the urgent partition's files are read
    assert all(
        "o_orderpriority=1-URGENT" in p for p in pruned.inputFiles()
    ), pruned.inputFiles()
    urgent = pruned.agg(
        F.sum("o_orderkey").cast("bigint").alias("uc")
    )
    return (
        full.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum("o_orderkey").cast("bigint").alias("key_checksum"),
            dsum("o_totalprice", scale=2).alias("revenue"),
        )
        .crossJoin(F.broadcast(urgent))
        .select(
            "priority",
            "n_orders",
            "key_checksum",
            "revenue",
            F.when(F.col("priority") == "1-URGENT", F.col("uc"))
            .cast("bigint")
            .alias("urgent_checksum"),
        )
    )


_DELTA_PART_SQL = f"""
SELECT o_orderpriority AS priority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_checksum,
       {sql_dsum("o_totalprice", scale=2)} AS revenue,
       CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT'
                THEN o_orderkey END) AS BIGINT) AS urgent_checksum
FROM orders
GROUP BY 1
"""


@register(
    "x_delta_partitioned_export", oracle=_DELTA_PART_SQL, tags=("S3", "P4"), doc=""
)
def x_delta_partitioned_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta export of an identity-PARTITIONED table (the
    x_iceberg_partitioned_export sibling on the log-replay side of the
    fence): the hive `priority=X/` layout exports with
    `metaData.partitionColumns` and REAL per-add `partitionValues`
    string maps (the spec's metadata-borne identity values — the files
    don't contain the column), and the independent log-replay reader
    injects them as typed literals while `partition_filter` prunes the
    FILE LIST during replay, before any data I/O. The in-query
    assertion pins that the pruned read touched ONLY the matching
    partition's files. The structural contrast with the Iceberg
    sibling: here pruning happens while REPLAYING the action log
    (O(history) planning); there it's one self-contained snapshot's
    manifest walk — same values, different metadata economics.
    Aggregate runs on the re-imported table with the urgent_checksum
    recomputed from the PRUNED read; the oracle recomputes from
    pristine orders."""
    import tempfile

    from ..sources.delta_import import read_delta_snapshot
    from ..sources.table_format import VersionedTable

    o = T(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    t = VersionedTable(spark, tempfile.mkdtemp(prefix="rdl_dpart_"))
    t.overwrite(o, partition_by=["o_orderpriority"])
    t.export_delta_log()

    full = read_delta_snapshot(spark, t.path)
    pruned = read_delta_snapshot(
        spark, t.path, partition_filter={"o_orderpriority": "1-URGENT"}
    )
    assert all(
        "o_orderpriority=1-URGENT" in p for p in pruned.inputFiles()
    ), pruned.inputFiles()
    urgent = pruned.agg(F.sum("o_orderkey").cast("bigint").alias("uc"))
    return (
        full.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum("o_orderkey").cast("bigint").alias("key_checksum"),
            dsum("o_totalprice", scale=2).alias("revenue"),
        )
        .crossJoin(F.broadcast(urgent))
        .select(
            "priority",
            "n_orders",
            "key_checksum",
            "revenue",
            F.when(F.col("priority") == "1-URGENT", F.col("uc"))
            .cast("bigint")
            .alias("urgent_checksum"),
        )
    )


_ICE_EXPIRE_SQL = f"""
WITH t AS (
  SELECT * FROM orders
  WHERE o_orderkey % 3 IN (0, 1) AND o_orderkey % 5 != 0)
SELECT o_orderstatus AS status,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       {sql_dsum("o_totalprice", scale=2)} AS revenue
FROM t GROUP BY 1
"""


@register("x_iceberg_snapshot_expire", oracle=_ICE_EXPIRE_SQL, tags=("S6", "S3"), doc="")
def x_iceberg_snapshot_expire(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg snapshot EXPIRATION — the retention half of the exported
    metadata lifecycle (export → incremental → import → partitioned →
    EXPIRE): a table exported daily carries an unbounded snapshot
    history until `expireSnapshots` bounds it. Contract pinned in-query:
    survivors keep resolving (including time travel to a RETAINED
    snapshot), expired ids STOP resolving, expired manifest-LIST files
    leave disk, but manifests REUSED BY REFERENCE by a surviving
    snapshot are protected (the sharing that makes incremental exports
    O(new files) also makes naive expiry dangerous — this is the case
    that matters), data files untouched, and the expiry itself commits
    as the next metadata version. Oracle = full recompute of the final
    live state. All metadata work is O(snapshots + manifests), zero
    data reads at any table size."""
    import json as _json
    import os as _os
    import tempfile

    from ..sources.iceberg_import import load_table_metadata, read_iceberg_snapshot
    from ..sources.table_format import VersionedTable

    o = T(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    t = VersionedTable(spark, tempfile.mkdtemp(prefix="rdl_ice_expire_"))
    t.overwrite(o.filter(k % 3 == 0).coalesce(2))  # v1
    t.export_iceberg_metadata()
    t.append(o.filter(k % 3 == 1).coalesce(1))  # v2
    t.export_iceberg_metadata()
    t.delete("o_orderkey % 5 = 0")  # v3 (materializing rewrite)
    t.export_iceberg_metadata()

    m3 = load_table_metadata(t.path)
    snaps = m3["snapshots"]
    assert len(snaps) == 3
    sid1, sid2, sid3 = (s["snapshot-id"] for s in snaps)

    def _ml_path(s):
        return _os.path.join(t.path, s["manifest-list"])

    def _manifests(s):
        with open(_ml_path(s)) as fh:
            return {m["manifest_path"] for m in _json.load(fh)["manifests"]}

    # snapshot 2 REUSES snapshot 1's manifest by reference — the shared
    # manifest must survive snapshot 1's expiry
    shared = _manifests(snaps[0]) & _manifests(snaps[1])
    assert shared
    ml1 = _ml_path(snaps[0])

    t.expire_iceberg_snapshots(keep_last=2)
    m = load_table_metadata(t.path)
    assert [s["snapshot-id"] for s in m["snapshots"]] == [sid2, sid3]
    assert len(m["snapshot-log"]) == 2
    assert "parent-snapshot-id" not in m["snapshots"][0]  # parent expired
    assert not _os.path.exists(ml1)  # expired manifest-list gone
    for mp in shared:  # reused manifests protected
        assert _os.path.exists(_os.path.join(t.path, mp))
    # retained time travel still resolves; expired id does not
    assert read_iceberg_snapshot(spark, t.path, snapshot_id=sid2).count() > 0
    try:
        read_iceberg_snapshot(spark, t.path, snapshot_id=sid1)
        raise AssertionError("expired snapshot must not resolve")
    except StopIteration:
        pass
    except ValueError:
        pass

    t.expire_iceberg_snapshots(keep_last=1)
    m = load_table_metadata(t.path)
    assert [s["snapshot-id"] for s in m["snapshots"]] == [sid3]
    # idempotent when nothing to expire
    t.expire_iceberg_snapshots(keep_last=1)
    assert len(load_table_metadata(t.path)["snapshots"]) == 1

    return (
        read_iceberg_snapshot(spark, t.path)
        .groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", scale=2).alias("revenue"),
        )
    )


_DELTA_CP_SQL = f"""
WITH t AS (
  SELECT * FROM orders
  WHERE o_orderkey % 3 IN (0, 1)
    AND o_orderkey % 5 != 0 AND o_orderkey % 7 != 0)
SELECT o_orderstatus AS status,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       {sql_dsum("o_totalprice", scale=2)} AS revenue
FROM t GROUP BY 1
"""


@register("x_delta_checkpoint_retention", oracle=_DELTA_CP_SQL, tags=("S6", "S3"), doc="")
def x_delta_checkpoint_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-protocol PARQUET CHECKPOINT + log retention — the Delta
    counterpart of x_iceberg_snapshot_expire, with the structural
    contrast that IS the lesson: Iceberg snapshots are self-contained
    (expiry just deletes objects), while Delta state is a log REPLAY —
    so bounding history needs a checkpoint (the spec's classic
    one-action-per-row parquet + `_last_checkpoint` pointer) BEFORE any
    commit file may be deleted. Pinned in-query: the checkpoint file +
    pointer exist; after truncation the pre-checkpoint JSON commits are
    gone; the INDEPENDENT stdlib/pyarrow reader now seeds from the
    checkpoint and replays only post-checkpoint commits (here: none)
    yet reproduces the exact final state (oracle = full recompute);
    time travel below the checkpoint raises the expired-history error;
    and a FURTHER incremental export on the truncated log still works
    (the exporter recovers the metaData contract from the checkpoint).
    All metadata work O(live files), zero data reads at any scale."""
    import os as _os
    import tempfile

    from ..sources.delta_import import read_delta_snapshot
    from ..sources.table_format import VersionedTable

    o = T(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    t = VersionedTable(spark, tempfile.mkdtemp(prefix="rdl_delta_cp_"))
    t.overwrite(o.filter(k % 3 == 0).coalesce(2))  # v1
    t.export_delta_log()  # commit 0
    t.append(o.filter(k % 3 == 1).coalesce(1))  # v2
    t.export_delta_log()  # commit 1
    t.delete("o_orderkey % 5 = 0")  # v3
    t.export_delta_log()  # commit 2

    log_dir = _os.path.join(t.path, "_delta_log")
    cp = t.export_delta_checkpoint()
    assert _os.path.basename(cp) == f"{2:020d}.checkpoint.parquet"
    assert _os.path.exists(_os.path.join(log_dir, "_last_checkpoint"))

    n_deleted = t.truncate_delta_log()
    assert n_deleted == 2  # commits 0 and 1 expired; head JSON retained
    left = sorted(f for f in _os.listdir(log_dir) if f.endswith(".json"))
    assert left == [f"{2:020d}.json"]

    # expired history must not resolve
    try:
        read_delta_snapshot(spark, t.path, version=0)
        raise AssertionError("pre-checkpoint version must not resolve")
    except ValueError:
        pass

    # further incremental export on the truncated log still works and
    # the checkpoint-seeded reader folds the new commit in
    t.delete("o_orderkey % 7 = 0")  # v4
    t.export_delta_log()  # commit 3 (replays from checkpoint + head)
    return (
        read_delta_snapshot(spark, t.path)
        .groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", scale=2).alias("revenue"),
        )
    )


_AES_SQL = """
SELECT o_orderpriority AS priority,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(16 * (FLOOR(LENGTH(o_orderpriority) / 16) + 1) AS BIGINT)
         AS ct_bytes
FROM orders
GROUP BY 1, 3
"""


@register("x_aes_roundtrip", oracle=_AES_SQL, tags=("F1", "F5"), doc="")
def x_aes_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level encryption governance: aes_encrypt the priority
    column (AES-128-ECB — the deterministic mode, chosen here so the
    ciphertext itself is stable and its PKCS#7-padded length is
    checkable; production would use the default GCM whose random IV
    makes ciphertext nondeterministic), aes_decrypt it back, and
    aggregate on the DECRYPTED value. The oracle aggregates the
    original column and derives the expected ciphertext length from
    plaintext length arithmetic (16-byte blocks, always-pad) — the hash
    match proves the round trip is lossless AND the ciphertext has real
    block structure, without ever comparing key-dependent bytes. At
    scale both functions are JVM codegen (no UDF); the pattern is the
    encrypt-at-rest / decrypt-in-query flow of a governed lakehouse."""
    key = F.lit("0123456789abcdef")  # 16-byte demo key (AES-128)
    o = T(spark, sf_dir, "orders").select(
        F.aes_encrypt(
            F.col("o_orderpriority").cast("binary"), key.cast("binary"), F.lit("ECB")
        ).alias("ct")
    )
    back = o.select(
        F.aes_decrypt(F.col("ct"), key.cast("binary"), F.lit("ECB"))
        .cast("string")
        .alias("priority"),
        F.octet_length("ct").cast("bigint").alias("ct_bytes"),
    )
    return back.groupBy("priority", "ct_bytes").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    ).select("priority", "n", "ct_bytes")


_LUHN_SQL = """
SELECT (o_orderkey % 2 = 0) AS staged_valid,
       (o_orderkey % 2 = 0) AS luhn_valid,
       CAST(COUNT(*) AS BIGINT) AS n
FROM orders
GROUP BY 1, 2
"""


@register("x_luhn_check", oracle=_LUHN_SQL, tags=("F1", "F3"), doc="")
def x_luhn_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII screening primitive: `luhn_check` (the checksum every card
    number passes) against numbers WE stage with hand-rolled Luhn
    arithmetic — a 15-digit payload from the order key gets its true
    check digit (JVM fold over the digit array: double every second
    digit from the right, subtract 9 above 9) when the key is even, and
    a deliberately-wrong one (+5 mod 10) when odd. The output grid
    (staged_valid, luhn_valid, count) must be diagonal; the oracle
    states that diagonal from key parity alone, so ANY disagreement
    between Spark's builtin and the textbook arithmetic breaks the
    hash. This is the payment-card leg of the PII family
    (l4_pii_screen has the regex side)."""
    o = T(spark, sf_dir, "orders").select("o_orderkey")
    # true check digit: fold the 15 payload digits right-to-left with
    # 2-1-2 weights (rightmost payload digit doubles), PURE column math.
    # r14 opt: the fold is rendered as ONE SQL expression string — the
    # baseline built ~300 Column objects (15 digit terms x ~10 py4j
    # round-trips each), ~2.5 s of driver time per call for identical
    # arithmetic (the F.lit(doubled) branches were compile-time
    # constants; the string emits the chosen branch directly).
    digit = lambda i: f"CAST(substring(__pl, {i}, 1) AS INT)"  # noqa: E731
    terms = [
        f"({digit(i)} * 2 - (CASE WHEN {digit(i)} * 2 > 9 THEN 9 ELSE 0 END))"
        if i % 2 == 1  # i odd => distance from right even => x2
        else digit(i)
        for i in range(1, 16)
    ]
    true_check = f"((10 - (({' + '.join(terms)}) % 10)) % 10)"
    staged_check = (
        f"(CASE WHEN o_orderkey % 2 = 0 THEN {true_check} "
        f"ELSE ({true_check} + 5) % 10 END)"
    )
    out = o.withColumn(
        "__pl",
        F.expr("lpad(CAST(o_orderkey % 100000000000000 AS STRING), 15, '0')"),
    ).select(
        (F.col("o_orderkey") % 2 == 0).alias("staged_valid"),
        F.expr(f"concat(__pl, CAST({staged_check} AS STRING))").alias("cc"),
    ).select(
        "staged_valid",
        F.expr("luhn_check(cc)").alias("luhn_valid"),
    )
    return out.groupBy("staged_valid", "luhn_valid").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )


_BOOLAGG_SQL = """
SELECT l_returnflag AS flag,
       bool_and(l_quantity >= 1) AS all_qty_pos,
       bool_or(CAST(round(l_discount * 100, 0) AS BIGINT) = 0)
         AS some_zero_disc,
       bool_and(CAST(round(l_discount * 100, 0) AS BIGINT) = 0)
         AS all_zero_disc,
       CAST(COUNT(*) FILTER (WHERE CAST(round(l_discount * 100, 0) AS BIGINT)
                                   = 0) AS BIGINT) AS n_zero_disc,
       any_value(upper(l_returnflag)) AS flag_upper
FROM lineitem
GROUP BY 1
"""


@register("x_bool_aggs", oracle=_BOOLAGG_SQL, tags=("A6", "F4"), doc="")
def x_bool_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregate surface: `every`/`some` (SQL:2023 names Spark
    and DuckDB expose as bool_and/bool_or aliases), FILTER-style
    conditional counting, and `any_value` — the pick-one aggregate that
    is nondeterministic IN GENERAL and therefore only oracle-safe over
    an expression CONSTANT within its group (upper(flag) here; the
    discipline any_value demands before it can appear in a replayed
    pipeline). All five are one partial-aggregable pass; every() short-
    circuits per partition map-side."""
    l = T(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        "l_quantity",
        F.round(F.col("l_discount") * 100, 0).cast("bigint").alias("dc"),
    )
    return l.groupBy(F.col("l_returnflag").alias("flag")).agg(
        F.every(F.col("l_quantity") >= 1).alias("all_qty_pos"),
        F.some(F.col("dc") == 0).alias("some_zero_disc"),
        F.every(F.col("dc") == 0).alias("all_zero_disc"),
        F.count_if(F.col("dc") == 0).cast("bigint").alias("n_zero_disc"),
        F.any_value(F.upper(F.col("l_returnflag"))).alias("flag_upper"),
    )
