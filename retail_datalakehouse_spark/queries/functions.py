"""Scalar-function queries (SURVEY §2.7 F1–F7).

Each family gets one query exercising its representative set, hash-checked
against DuckDB. Determinism conventions: per-row IEEE double math stays raw
(bit-identical across engines); `round` on raw doubles is avoided except
where inputs are exact decimals; string/date functions are locale-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T_

from .base import register
from .helpers import T, dsum


@register(
    "f1_string_functions",
    oracle="""
SELECT p_partkey,
       UPPER(p_name) AS name_upper,
       LOWER(p_brand) AS brand_lower,
       TRIM(p_type) AS type_trim,
       LENGTH(p_name) AS name_len,
       SUBSTRING(p_name, 1, 5) AS name_pfx,
       CONCAT(p_brand, ':', p_type) AS brand_type,
       regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
       REPLACE(p_name, ' ', '_') AS name_snake,
       CAST(p_name LIKE '%or%' AS BOOLEAN) AS has_or
FROM part
""",
    tags=("F1",),
)
def f1_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: upper/lower/trim/length/substring/concat/
    regexp_extract/replace/like — the dept-name normalization +
    filename-regex surface (`s3_bucket.py:51` is a regexp_extract)."""
    p = T(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.trim("p_type").alias("type_trim"),
        F.length("p_name").cast("long").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_pfx"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
        F.regexp_extract("p_brand", r"([0-9]+)", 1).alias("brand_num"),
        F.regexp_replace("p_name", " ", "_").alias("name_snake"),
        F.col("p_name").like("%or%").alias("has_or"),
    )


@register(
    "f2_datetime_functions",
    oracle="""
SELECT o_orderkey,
       CAST(o_orderdate AS DATE) AS o_date,
       CAST(year(o_orderdate) AS INT) AS yr,
       CAST(month(o_orderdate) AS INT) AS mth,
       CAST(dayofweek(CAST(o_orderdate AS DATE)) + 1 AS INT) AS dow,
       CAST(date_trunc('quarter', CAST(o_orderdate AS DATE)) AS DATE) AS qtr_start,
       CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since_epoch0,
       CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS due_date,
       CAST(epoch(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT) AS unix_ts
FROM orders
""",
    tags=("F2",),
)
def f2_datetime_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family: year/month/dayofweek/date_trunc/datediff/date_add/
    unix_timestamp — the date-partition arithmetic of the daily-drop layout.
    (DuckDB `dayofweek` is 0=Sun..6; Spark is 1=Sun..7 — oracle adds 1.)"""
    o = T(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        d.alias("o_date"),
        F.year(d).alias("yr"),
        F.month(d).alias("mth"),
        F.dayofweek(d).alias("dow"),
        F.trunc(d, "quarter").alias("qtr_start"),
        F.datediff(d, F.lit("1995-01-01").cast("date")).alias("days_since_epoch0"),
        F.date_add(d, 30).alias("due_date"),
        F.unix_timestamp(F.col("o_orderdate")).alias("unix_ts"),
    )


@register(
    "f3_math_functions",
    oracle="""
SELECT l_orderkey, l_linenumber,
       ABS(l_extendedprice - 30000.0) AS abs_dev,
       CAST(FLOOR(l_extendedprice) AS BIGINT) AS price_floor,
       CAST(CEIL(l_quantity) AS BIGINT) AS qty_ceil,
       SQRT(l_extendedprice) AS price_sqrt,
       CAST(FLOOR(LN(l_extendedprice + 1) * 1000000) AS BIGINT) AS price_ln_q6,
       POWER(l_discount, 2) AS disc_sq,
       CAST(l_quantity AS BIGINT) % 7 AS qty_mod
FROM lineitem
""",
    tags=("F3",),
)
def f3_math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family: abs/floor/ceil/sqrt/ln/power/mod — money arithmetic.
    abs/floor/ceil/sqrt/x² are IEEE-deterministic per row; LN is NOT
    (libm last-ulp divergence: JVM 10.602723906393901 vs DuckDB ...903,
    surfaced the moment the r11 mirror went full-precision), so the ln
    output is quantized to an integer (floor(ln·1e6)) — the repo's
    standard reduce-to-integers pattern for transcendental parity."""
    l = T(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_extendedprice") - 30000.0).alias("abs_dev"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.sqrt("l_extendedprice").alias("price_sqrt"),
        F.floor(F.log(F.col("l_extendedprice") + 1) * 1000000)
        .cast("long")
        .alias("price_ln_q6"),
        F.pow("l_discount", F.lit(2)).alias("disc_sq"),
        (F.col("l_quantity").cast("long") % 7).alias("qty_mod"),
    )


@register(
    "f4_conditional_null",
    oracle="""
SELECT event_id,
       CASE WHEN value > 250 THEN 'high' WHEN value > 100 THEN 'mid' ELSE 'low' END AS value_band,
       COALESCE(NULLIF(event_type, 'error'), 'UNKNOWN') AS clean_type,
       CAST(value IS NULL AS BOOLEAN) AS value_missing,
       IFNULL(NULLIF(user_id, 0), -1) AS user_or_default
FROM events
""",
    tags=("F4",),
)
def f4_conditional_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional/null family: when/otherwise, coalesce, nullif, nvl —
    the NULL-tolerance surface (765 empty `days_since_prior_order` rows in
    the reference demand it, SURVEY §1.3)."""
    e = T(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.when(F.col("value") > 250, "high")
        .when(F.col("value") > 100, "mid")
        .otherwise("low")
        .alias("value_band"),
        F.coalesce(F.nullif(F.col("event_type"), F.lit("error")), F.lit("UNKNOWN")).alias(
            "clean_type"
        ),
        F.col("value").isNull().alias("value_missing"),
        F.nvl(F.nullif(F.col("user_id"), F.lit(0)), F.lit(-1)).alias("user_or_default"),
    )


@register(
    "f5_casts",
    oracle="""
SELECT o_orderkey,
       CAST(o_orderkey AS VARCHAR) AS key_str,
       CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) AS key_roundtrip,
       CAST(FLOOR(o_totalprice) AS BIGINT) AS price_int,
       CAST(o_orderdate AS DATE) AS as_date,
       CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS date_str,
       CAST('42' AS BIGINT) + o_orderkey AS parsed_plus
FROM orders
""",
    tags=("F5",),
)
def f5_casts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cast/convert family: string↔numeric↔date — the CSV→typed-bronze
    surface (crawler inference replaced by explicit casts, SURVEY §1.4).
    DuckDB CAST(double AS BIGINT)
    rounds while Spark truncates — both sides use FLOOR explicitly."""
    o = T(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.col("o_orderkey").cast("string").cast("long").alias("key_roundtrip"),
        F.floor("o_totalprice").alias("price_int"),
        d.alias("as_date"),
        d.cast("string").alias("date_str"),
        (F.lit("42").cast("long") + F.col("o_orderkey")).alias("parsed_plus"),
    )


@register(
    "f6_array_functions",
    oracle="""
SELECT vec_id,
       len(embedding) AS dim,
       CAST(embedding[1] AS DOUBLE) AS first_elem,
       CAST(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)), 'sum') AS DOUBLE) AS vec_sum,
       CAST(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)), 'max') AS DOUBLE) AS vec_max,
       CAST(len(list_filter(embedding, x -> CAST(x AS DOUBLE) > 0.0)) > 0 AS BOOLEAN) AS any_positive
FROM embeddings
""",
    tags=("F6",),
)
def f6_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family over `embeddings.embedding: array<float>`: size,
    element access, fold-sum, max, exists — the primitives under the
    similarity-search extension (L3). Elements cast float→double (exact)
    before the sequential fold so both engines reduce identically."""
    e = T(spark, sf_dir, "embeddings")
    dvec = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.element_at(F.col("embedding"), 1).cast("double").alias("first_elem"),
        F.aggregate(dvec, F.lit(0.0), lambda acc, x: acc + x).alias("vec_sum"),
        F.array_max(dvec).alias("vec_max"),
        F.exists(dvec, lambda x: x > 0.0).alias("any_positive"),
    )


@register(
    "f7_json_functions",
    oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
       CAST(json_extract_string(props, '$.missing') AS VARCHAR) AS missing_key,
       CAST(json_valid(props) AS BOOLEAN) AS is_valid_json
FROM events
""",
    tags=("F7", "S8"),
)
def f7_json_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON family over the semi-structured `events.props` string column
    (S8 ingestion): path extraction via from_json with an explicit schema
    (typed, vectorizable) + get_json_object for ad-hoc paths."""
    e = T(spark, sf_dir, "events")
    schema = T_.StructType([T_.StructField("k", T_.LongType())])
    return e.select(
        "event_id",
        F.from_json(F.col("props"), schema).getField("k").alias("k_value"),
        F.get_json_object(F.col("props"), "$.missing").alias("missing_key"),
        F.get_json_object(F.col("props"), "$").isNotNull().alias("is_valid_json"),
    )


@register(
    "f3_bitwise_and_bounds",
    oracle="""
SELECT o_orderkey,
       o_orderkey & 255 AS key_and,
       o_orderkey | 4096 AS key_or,
       xor(o_orderkey, o_custkey) AS key_xor,
       GREATEST(o_totalprice, 100000.0) AS price_floor_clamp,
       LEAST(o_totalprice, 400000.0) AS price_ceil_clamp,
       CAST(sign(o_totalprice - 250000.0) AS DOUBLE) AS above_mid
FROM orders
""",
    tags=("F3",),
)
def f3_bitwise_and_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise ops (and/or/xor — the bucket/partition-id arithmetic under
    hash layouts) + greatest/least clamps + sign."""
    o = T(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("key_and"),
        k.bitwiseOR(F.lit(4096)).alias("key_or"),
        k.bitwiseXOR(F.col("o_custkey")).alias("key_xor"),
        F.greatest("o_totalprice", F.lit(100000.0)).alias("price_floor_clamp"),
        F.least("o_totalprice", F.lit(400000.0)).alias("price_ceil_clamp"),
        F.signum(F.col("o_totalprice") - 250000.0).alias("above_mid"),
    )


@register(
    "f8_variant_semistructured",
    oracle="""
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k,
       CAST(SUM(CASE WHEN CAST(json_extract(props, '$.k') AS BIGINT) > 50
                THEN 1 ELSE 0 END) AS BIGINT) AS n_hi
FROM events
GROUP BY event_type
""",
    tags=("F7",),
    doc="",
)
def f8_variant_semistructured(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT semi-structured analytics (Spark 4 VariantType — the
    engine-native open-JSON column Delta/Snowflake variant maps to):
    ``parse_json`` decodes each event's ``props`` payload ONCE into the
    binary variant encoding, then ``variant_get`` does typed path
    extraction JVM-side — no per-access string re-parse, no UDF; at
    100 TB the variant binary beats repeated ``get_json_object`` string
    scans because fields are offset-indexed, not re-tokenized per
    extraction. Drilled in-query on real rows: ``schema_of_variant``
    reports the payload's inferred shape, ``try_variant_get`` on a
    missing path yields NULL (never an error), and a NESTED variant
    built from row values round-trips ``$.u.id`` exactly. The oracle
    reads the same payloads with DuckDB's JSON path functions."""
    e = T(spark, sf_dir, "events")
    v = e.select(
        "event_type",
        "user_id",
        F.parse_json("props").alias("v"),
    )

    # variant semantics pinned on a bounded sample (one collect of 3 rows)
    probe = v.select(
        F.schema_of_variant("v").alias("sch"),
        F.try_variant_get("v", "$.nope", "string").alias("missing"),
        F.variant_get("v", "$.k", "bigint").alias("k"),
        F.variant_get(
            F.parse_json(
                F.concat(
                    F.lit('{"u":{"id":'),
                    F.col("user_id").cast("string"),
                    F.lit('},"k":'),
                    F.variant_get("v", "$.k", "bigint").cast("string"),
                    F.lit("}"),
                )
            ),
            "$.u.id",
            "bigint",
        ).alias("nested_uid"),
        "user_id",
    ).take(3)
    for r in probe:
        assert r.sch == "OBJECT<k: BIGINT>", r.sch
        assert r.missing is None
        assert r.nested_uid == r.user_id  # nested path round-trip

    k = F.variant_get("v", "$.k", "bigint")
    return v.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(k).alias("sum_k"),
        F.max(k).alias("max_k"),
        F.sum(F.when(k > 50, 1).otherwise(0)).alias("n_hi"),
    )


_TRY_SQL = """
SELECT o_orderpriority AS priority,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(*) FILTER (WHERE o_orderkey % 3 = 0) AS BIGINT) AS n_div_null,
       CAST(SUM(CAST(FLOOR(o_totalprice / NULLIF(o_orderkey % 3, 0)) AS BIGINT))
            AS BIGINT) AS div_floor_sum,
       CAST(COUNT(*) FILTER (WHERE o_orderkey > 7) AS BIGINT) AS n_overflow_null,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(25,2))), 2) AS DOUBLE) AS reparsed_total,
       CAST(COUNT(*) AS BIGINT) AS n_badparse
FROM orders
GROUP BY 1
"""


@register("f10_try_arithmetic", oracle=_TRY_SQL, tags=("F3", "F5"), doc="")
def f10_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe arithmetic (`try_divide` / `try_add` / `try_to_number`
    / `try_cast` — ANSI mode's escape hatches): at 100 TB a single
    malformed row must NOT kill a 6-hour job, and silently-wrong
    non-ANSI wraparound is worse; the try_* family returns NULL per
    offending ROW and the pipeline quarantines instead of aborting.
    Exercised here: division by a zero denominator (NULL, counted),
    int64 overflow via try_add against a near-MAX literal (NULL exactly
    where o_orderkey > 7 — value-pinned, not just counted), locale-
    formatted string re-parsing with try_to_number (the round-trip sum
    proves every grouped-format value reparsed exactly), and try_cast
    of non-numeric text (NULL for every row). All per-row JVM
    expressions inside whole-stage codegen — the error handling costs
    nothing over the unchecked path. Oracle recomputes each leg
    relationally (FILTER counts + NULLIF guard + decimal sum)."""
    o = T(spark, sf_dir, "orders")
    i64_near_max = F.lit(9223372036854775800).cast("bigint")
    en = o.select(
        "o_orderpriority",
        "o_totalprice",
        F.try_divide(F.col("o_totalprice"), F.col("o_orderkey") % 3).alias("ratio"),
        F.try_add(i64_near_max, F.col("o_orderkey")).alias("ovf"),
        F.try_to_number(
            F.format_number(F.col("o_totalprice"), 2), F.lit("999,999,999.99")
        )
        .cast("double")
        .alias("reparsed"),
        F.expr("try_cast(o_orderstatus AS DOUBLE)").alias("badparse"),
    )
    return en.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("ratio").isNull().cast("int")).cast("bigint").alias("n_div_null"),
        F.sum(F.floor("ratio").cast("bigint")).cast("bigint").alias("div_floor_sum"),
        F.sum(F.col("ovf").isNull().cast("int")).cast("bigint").alias("n_overflow_null"),
        F.round(F.sum(F.col("reparsed").cast("decimal(25,2)")), 2)
        .cast("double")
        .alias("reparsed_total"),
        F.sum(F.col("badparse").isNull().cast("int")).cast("bigint").alias("n_badparse"),
    )


_MAP_HOF_SQL = """
WITH cell AS (
  SELECT o_orderstatus AS status, o_orderpriority AS priority,
         COUNT(*) AS n,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(25,2))) * 100 AS BIGINT) AS cents
  FROM orders GROUP BY 1, 2)
SELECT status,
       CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(SUM(n) AS BIGINT) AS n_orders,
       STRING_AGG(priority || ':' || (cents // n), ';' ORDER BY priority)
         AS avg_cents_entries
FROM cell GROUP BY 1
"""


@register("f11_map_higher_order", oracle=_MAP_HOF_SQL, tags=("F6", "F7"), doc="")
def f11_map_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAP higher-order functions (the F6 array-lambda family's map
    sibling: map_from_entries / map_zip_with / map_filter /
    map_entries): two per-status maps — priority->order-count and
    priority->revenue-cents — zip POSITIONALLY BY KEY into
    average-cents-per-order, filter, and render as deterministic sorted
    entry strings (maps are unordered, so the only hashable projection
    is through sorted entries — the same rule the complex-type lint
    enforces). All lambdas are Catalyst expressions (LambdaFunction
    nodes, JVM-evaluated inside codegen — zero Python). The integer
    division is `cents DIV n` on exact integers on both engines. The
    100 TB point: per-key maps let ONE row carry a whole sub-table
    through a shuffle (the map stays inside the row), which is how
    mart tables ship per-dimension breakdowns without exploding rows;
    the zip/filter algebra then runs post-shuffle at O(keys) per row."""
    o = T(spark, sf_dir, "orders")
    cell = o.groupBy(
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderpriority").alias("priority"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(F.col("o_totalprice").cast("decimal(25,2)")) * 100)
        .cast("bigint")
        .alias("cents"),
    )
    maps = cell.groupBy("status").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("priority", "n")))
        ).alias("m_orders"),
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("priority", "cents")))
        ).alias("m_cents"),
    )
    zipped = maps.select(
        "status",
        "m_orders",
        F.map_filter(
            # exact floor division: (c - c%n)/n is an exact integer in
            # double space, so the cast can never straddle (plain c/n
            # could round up at a 2^53-adjacent boundary)
            F.map_zip_with(
                "m_orders", "m_cents",
                lambda k, n, c: ((c - c % n) / n).cast("bigint"),
            ),
            lambda k, v: v.isNotNull(),
        ).alias("m_avg"),
    )
    return zipped.select(
        "status",
        F.size("m_avg").cast("bigint").alias("n_keys"),
        F.aggregate(
            F.map_values("m_orders"), F.lit(0).cast("bigint"), lambda acc, x: acc + x
        ).alias("n_orders"),
        F.array_join(
            F.transform(
                F.map_entries("m_avg"),
                lambda e: F.concat(e["key"], F.lit(":"), e["value"].cast("string")),
            ),
            ";",
        ).alias("avg_cents_entries"),
    )


_COLLATION_SQL = """
WITH cased AS (
  SELECT UPPER(c_mktsegment) AS seg, c_acctbal FROM customer
  UNION ALL
  SELECT LOWER(c_mktsegment), c_acctbal FROM customer
  UNION ALL
  SELECT UPPER(SUBSTR(c_mktsegment, 1, 1)) || LOWER(SUBSTR(c_mktsegment, 2)),
         c_acctbal
  FROM customer)
SELECT LOWER(seg) AS segment,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT seg) AS BIGINT) AS n_spellings,
       CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(25,2))), 2) AS DOUBLE) AS balance
FROM cased
GROUP BY 1
"""


@register("x_string_collation", oracle=_COLLATION_SQL, tags=("F1", "A1"), doc="")
def x_string_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String COLLATIONS (Spark 4's `collate(col, 'UTF8_LCASE')` —
    case-insensitive comparison as a TYPE property, the SQL-standard
    answer to the lower()-everywhere anti-pattern): three case
    spellings of every segment (UPPER / lower / Initcap) collapse into
    one group under the case-insensitive collation — grouping, equality
    and DISTINCT all follow the collation with ZERO expression rewrites
    at the use sites. The projection lowercases the group key because a
    collated group's representative is whichever spelling arrived first
    (explicitly unspecified — the one thing a collated pipeline must
    never emit raw); n_spellings = 3 pins that DISTINCT still sees the
    raw strings when asked. At 100 TB collation-aware grouping hashes
    the collation key directly — one pass, no derived lower() column
    materialized through the shuffle. Oracle mirrors with LOWER()
    normalization, the pre-collation idiom."""
    c = T(spark, sf_dir, "customer").select("c_mktsegment", "c_acctbal")
    cased = (
        c.select(F.upper("c_mktsegment").alias("seg"), "c_acctbal")
        .unionAll(c.select(F.lower("c_mktsegment").alias("seg"), "c_acctbal"))
        .unionAll(c.select(F.initcap(F.lower("c_mktsegment")).alias("seg"), "c_acctbal"))
    )
    coll = cased.select(F.collate(F.col("seg"), "UTF8_LCASE").alias("cseg"), "seg", "c_acctbal")
    return coll.groupBy("cseg").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct(F.collate(F.col("seg"), "UTF8_BINARY")).cast("bigint").alias(
            "n_spellings"
        ),
        dsum("c_acctbal", scale=2).alias("balance"),
    ).select(
        F.lower(F.col("cseg").cast("string")).alias("segment"),
        "n_rows",
        "n_spellings",
        "balance",
    )
