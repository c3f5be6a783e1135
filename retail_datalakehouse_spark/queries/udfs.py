"""UDF-surface queries (SURVEY §2.9 U1–U5) + approx aggregates (A3).

The engine's UDF doctrine: built-ins first (everything in other modules is
UDF-free); when Python is unavoidable, Arrow-batched pandas UDFs, never
row-at-a-time in the hot path. U1 deliberately shows the slow path
(scalar Python UDF) for parity; U2–U4 show the production shapes.

Oracle-parity notes: U2's vectorized arithmetic is elementwise IEEE —
bit-identical to SQL. U3 uses min-max normalization (min/max are exact,
no summation-order hazard). U4's weighted mean goes through Python
``decimal`` with the same quantization as the SQL ``CAST(x AS
DECIMAL(25,4))`` sum — exact on both sides.
"""

from __future__ import annotations

import decimal
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T_

from .base import register
from .helpers import T


@register(
    "u1_scalar_python_udf",
    oracle="""
SELECT l_orderkey, l_linenumber,
       CASE WHEN l_quantity > 40 THEN 'bulk'
            WHEN l_quantity > 10 THEN 'standard'
            ELSE 'small' END AS basket_bucket
FROM lineitem
""",
    tags=("U1",),
)
def u1_scalar_python_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1: row-at-a-time Python UDF (the slow path, shown once): basket
    bucket label. Same logic as a SQL CASE — which is what you'd ship."""

    @F.udf(T_.StringType())
    def bucket(q):
        if q is None:
            return None
        if q > 40:
            return "bulk"
        if q > 10:
            return "standard"
        return "small"

    l = T(spark, sf_dir, "lineitem")
    return l.select("l_orderkey", "l_linenumber", bucket("l_quantity").alias("basket_bucket"))


@register(
    "u2_pandas_scalar_udf",
    oracle="""
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charged
FROM lineitem
""",
    tags=("U2",),
)
def u2_pandas_scalar_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2: Arrow-batched pandas scalar UDF — vectorized numpy arithmetic,
    ~10-100× the throughput of U1. Elementwise IEEE ops are bit-identical
    to the SQL expression, so the oracle needs no rounding at all."""

    @F.pandas_udf(T_.DoubleType())
    def charged(price: pd.Series, disc: pd.Series, tax: pd.Series) -> pd.Series:
        return price * (1.0 - disc) * (1.0 + tax)

    l = T(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        charged("l_extendedprice", "l_discount", "l_tax").alias("charged"),
    )


@register(
    "u3_grouped_map_normalize",
    oracle="""
SELECT o_custkey AS custkey, o_orderkey AS orderkey,
       CASE WHEN mx = mn THEN 0.5 ELSE (o_totalprice - mn) / (mx - mn) END AS spend_norm
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         MIN(o_totalprice) OVER (PARTITION BY o_custkey) AS mn,
         MAX(o_totalprice) OVER (PARTITION BY o_custkey) AS mx
  FROM orders
) t
""",
    tags=("U3",),
)
def u3_grouped_map_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3: per-group pandas transform (applyInPandas): min-max normalize
    each customer's order amounts. min/max carry no summation-order hazard,
    and the per-row normalization is elementwise IEEE — exact vs the
    window-function oracle."""
    schema = T_.StructType(
        [
            T_.StructField("custkey", T_.LongType()),
            T_.StructField("orderkey", T_.LongType()),
            T_.StructField("spend_norm", T_.DoubleType()),
        ]
    )

    def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
        # vectorized per-customer min-max inside the composite frame: the
        # SAME elementwise IEEE arithmetic the one-customer kernel did
        g = pdf.groupby("o_custkey")["o_totalprice"]
        mn, mx = g.transform("min"), g.transform("max")
        norm = ((pdf["o_totalprice"] - mn) / (mx - mn)).where(mx > mn, 0.5)
        return pd.DataFrame(
            {"custkey": pdf["o_custkey"], "orderkey": pdf["o_orderkey"], "spend_norm": norm}
        )

    # r14 opt (guide §4.1): ship ONLY the three columns the kernel reads —
    # applyInPandas is opaque to column pruning, so an unprojected input
    # serialized all nine order columns through Arrow per group.
    o = T(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_totalprice")
    # r15 (verdict item 7, guide §4.5): COMPOSITE groups — applyInPandas
    # pays roughly a millisecond of pandas-frame overhead PER GROUP, so
    # ~15k single-customer groups cost ~13 s while the kernel itself is
    # microseconds. Group instead by a deterministic hash bucket that packs
    # many customers into one Arrow batch (a customer never splits across
    # buckets, so per-customer results are unchanged) and normalize per
    # customer INSIDE the frame. Bucket count derives from the INPUT SIZE
    # (≈1 MiB of pruned scan per bucket, floor 4x parallelism), so frames
    # stay memory-bounded at any scale instead of growing with the data.
    from ..operators.parallelism import _plan_size_bytes

    par = spark.sparkContext.defaultParallelism
    n_buckets = max(4 * par, (_plan_size_bytes(o) or 0) >> 20)
    b = o.withColumn("_b", F.pmod(F.xxhash64("o_custkey"), F.lit(n_buckets)))
    return b.groupBy("_b").applyInPandas(normalize, schema)


@register(
    "u4_grouped_agg_weighted_avg",
    oracle="""
SELECT p.p_brand AS brand,
       CAST(ROUND(SUM(CAST(l.l_extendedprice * l.l_quantity AS DECIMAL(25,4)))
             / SUM(CAST(l.l_quantity AS DECIMAL(25,4))), 4) AS DOUBLE) AS weighted_avg_price
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY 1
""",
    tags=("U4",),
)
def u4_grouped_agg_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U4: custom UDAF via pandas GROUPED_AGG — quantity-weighted mean
    price per brand. Python ``decimal`` with the same half-up quantization
    as the oracle's DECIMAL(25,4) casts → exact parity, no float noise."""
    Q4 = decimal.Decimal("0.0001")

    @F.pandas_udf(T_.DoubleType())
    def wavg(price: pd.Series, qty: pd.Series) -> float:
        num = decimal.Decimal(0)
        den = decimal.Decimal(0)
        for p_, q_ in zip(price, qty):
            num += decimal.Decimal(p_ * q_).quantize(Q4, rounding=decimal.ROUND_HALF_UP)
            den += decimal.Decimal(q_).quantize(Q4, rounding=decimal.ROUND_HALF_UP)
        return float((num / den).quantize(Q4, rounding=decimal.ROUND_HALF_UP))

    l = T(spark, sf_dir, "lineitem")
    p = T(spark, sf_dir, "part")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(wavg("l_extendedprice", "l_quantity").alias("weighted_avg_price"))
    )


@register(
    "u5_udtf_expand",
    oracle="""
SELECT doc_id, word, n
FROM (
  SELECT doc_id, word, COUNT(*) AS n,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY COUNT(*) DESC, word) AS rn
  FROM (SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t != '')) AS word
        FROM documents)
  GROUP BY doc_id, word
) t
WHERE rn <= 3
""",
    tags=("U5",),
)
def u5_udtf_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U5: table-function expansion (one row → many): per-doc top-3 words.
    Expressed as explode (Spark's native UDTF shape — a Python ``@udtf``
    variant is pinned in tests/test_udfs.py)."""
    from pyspark.sql import Window

    from ..operators.text import tokens

    d = T(spark, sf_dir, "documents")
    counts = (
        d.select("doc_id", F.explode(tokens("text")).alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("n"), F.asc("word"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "word", "n")
    )


@register(
    "a3_approx_count_distinct",
    oracle=None,  # HLL sketches differ across engines → rows-only
    tags=("A3",),
)
def a3_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: approx_count_distinct (HyperLogLog++) — the 100 TB substitute
    for exact COUNT(DISTINCT): no expand, partial-mergeable sketches.
    Estimates are engine-specific → rows-only; the exactness-bound test
    (±5% of true) lives in tests/test_llm_ops.py."""
    o = T(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.approx_count_distinct("o_custkey", 0.02).alias("approx_customers"),
        F.countDistinct("o_custkey").alias("exact_customers"),
    )


@register(
    "u6_sql_registered_udf",
    oracle="""
SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
            WHEN o_totalprice < 200000 THEN 'mid'
            ELSE 'large' END AS bucket,
       COUNT(*) AS n_orders,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(25,2))), 2) AS DOUBLE) AS revenue
FROM orders
GROUP BY 1
""",
    tags=("U1", "F4"),
)
def u6_sql_registered_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDF surface via the SQL front door: `spark.udf.register` makes a
    Python function callable from SQL text — the path BI tools and SQL
    users hit (vs the DataFrame-side F.udf of u1). The function is the
    order-size bucketer; the oracle is the same logic as a SQL CASE.
    Registered per-call with an idempotent name; at scale the same
    registration serves every query in the session."""
    from pyspark.sql import types as T_

    from ..catalog import register_views

    def bucket(price: float) -> str:
        if price < 50000:
            return "small"
        if price < 200000:
            return "mid"
        return "large"

    spark.udf.register("order_bucket", bucket, T_.StringType())
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT order_bucket(o_totalprice) AS bucket,
               COUNT(*) AS n_orders,
               CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(25,2))), 2) AS DOUBLE) AS revenue
        FROM orders
        GROUP BY 1
        """
    )


@register(
    "u7_polymorphic_udtf",
    # Two LATERAL calls with DIFFERENT literal field lists -> two
    # different UDTF output schemas in one query; the oracle re-derives
    # both extractions with plain JSON path functions.
    oracle="""
SELECT 'k' AS fields,
       COUNT(*) AS n_events,
       CAST(SUM(CASE WHEN json_extract_string(props, '$.k') IS NOT NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_present,
       CAST(SUM(CAST(COALESCE(json_extract_string(props, '$.k'), '0') AS BIGINT))
            AS BIGINT) AS k_sum
FROM events
UNION ALL
SELECT 'k,q', COUNT(*),
       CAST(SUM(CASE WHEN json_extract_string(props, '$.k') IS NOT NULL
                       OR json_extract_string(props, '$.q') IS NOT NULL
                     THEN 1 ELSE 0 END) AS BIGINT),
       CAST(SUM(CAST(COALESCE(json_extract_string(props, '$.k'), '0') AS BIGINT))
            AS BIGINT)
FROM events
""",
    tags=("U5", "F7"),
)
def u7_polymorphic_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POLYMORPHIC Python UDTF (Spark 3.5+/4 ``analyze``): the function's
    output schema is computed AT PLAN TIME from a literal argument — here
    ``parse_props('k')`` emits one typed column while ``parse_props('k,q')``
    emits two, from the same registration. This is the schema-driven
    semi-structured extraction shape (config-defined telemetry parsing)
    that fixed-schema ``from_json`` can't express as one reusable
    function. Each call runs as an Arrow-batched LATERAL table function;
    the aggregate on top keeps the gate output scalar. Row-at-a-time
    JSON parsing is the demo cost — production paths in this repo stay
    with from_json (f7) when the schema is static."""
    import json

    from pyspark.sql.functions import udtf
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    from ..catalog import register_views

    @udtf
    class ParseProps:
        @staticmethod
        def analyze(
            event_id: AnalyzeArgument, props: AnalyzeArgument, fields: AnalyzeArgument
        ) -> AnalyzeResult:
            names = [n.strip() for n in fields.value.split(",")]
            st = T_.StructType(
                [T_.StructField("event_id", T_.LongType())]
                + [T_.StructField(n, T_.LongType()) for n in names]
            )
            return AnalyzeResult(schema=st)

        def eval(self, event_id, props, fields):
            try:
                d = json.loads(props) if props else {}
            except ValueError:
                d = {}
            yield (event_id, *[d.get(n.strip()) for n in fields.split(",")])

    spark.udtf.register("parse_props", ParseProps)
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT 'k' AS fields, COUNT(*) AS n_events,
               CAST(SUM(CASE WHEN p.k IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_present,
               CAST(SUM(COALESCE(p.k, 0)) AS BIGINT) AS k_sum
        FROM events e, LATERAL parse_props(e.event_id, e.props, 'k') p
        UNION ALL
        SELECT 'k,q', COUNT(*),
               CAST(SUM(CASE WHEN p.k IS NOT NULL OR p.q IS NOT NULL
                             THEN 1 ELSE 0 END) AS BIGINT),
               CAST(SUM(COALESCE(p.k, 0)) AS BIGINT)
        FROM events e, LATERAL parse_props(e.event_id, e.props, 'k,q') p
        """
    )


@register(
    "u8_arrow_grouped_map",
    oracle="""
SELECT o_custkey AS custkey, o_orderkey AS orderkey,
       CAST(ROW_NUMBER() OVER (
           PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
       ) AS BIGINT) AS spend_rank
FROM orders
""",
    tags=("U3", "U2"),
)
def u8_arrow_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group transform on the ARROW-NATIVE lane
    (GroupedData.applyInArrow, Spark 4): each customer's orders arrive
    as one pyarrow.Table and are ranked by spend with pyarrow.compute
    kernels (sort_indices → inverse permutation) — no pandas object
    materialization at all, which is the applyInArrow win over U3's
    applyInPandas: zero-copy Arrow in, vectorized C++ kernels, Arrow
    out. Rank output is integer-exact under the total order
    (o_totalprice DESC, o_orderkey), so parity with the ROW_NUMBER
    oracle is bit-for-bit. Same distribution shape as every grouped map:
    one hash shuffle on the grouping key, then embarrassingly parallel
    per-group batches — the 100 TB shape for per-entity feature
    engineering."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    schema = T_.StructType(
        [
            T_.StructField("custkey", T_.LongType()),
            T_.StructField("orderkey", T_.LongType()),
            T_.StructField("spend_rank", T_.LongType()),
        ]
    )

    def rank_orders(tbl: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            tbl,
            sort_keys=[
                ("o_totalprice", "descending"),
                ("o_orderkey", "ascending"),
            ],
        )
        # inverse permutation: row i's rank = its position in the sort
        ranks = np.empty(len(tbl), dtype="int64")
        ranks[order.to_numpy()] = np.arange(1, len(tbl) + 1)
        return pa.table(
            {
                "custkey": tbl["o_custkey"],
                "orderkey": tbl["o_orderkey"],
                "spend_rank": pa.array(ranks, type=pa.int64()),
            }
        )

    o = T(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )
    return o.groupBy("o_custkey").applyInArrow(rank_orders, schema)


@register(
    "u9_udtf_table_arg",
    # Oracle: gaps-and-islands re-derivation of the same per-user
    # consecutive-event runs — island id = cumulative count of type
    # changes in (ts, event_id) order.
    oracle="""
WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id
           FROM events),
g AS (SELECT user_id, event_type, ts, event_id,
             CASE WHEN LAG(event_type) OVER
                       (PARTITION BY user_id ORDER BY ts, event_id)
                       IS DISTINCT FROM event_type
                  THEN 1 ELSE 0 END AS brk
      FROM e),
s AS (SELECT user_id, event_type,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS isl
      FROM g),
runs AS (SELECT user_id, event_type, COUNT(*) AS run_len
         FROM s GROUP BY user_id, event_type, isl)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_runs,
       CAST(MAX(run_len) AS BIGINT) AS max_run,
       CAST(SUM(run_len) AS BIGINT) AS n_events
FROM runs GROUP BY event_type
""",
    tags=("U5", "W3"),
)
def u9_udtf_table_arg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF with a TABLE ARGUMENT (Spark 4's
    ``f(TABLE(...) PARTITION BY ... ORDER BY ...)``): the engine routes
    each user's events — ordered — through ONE UDTF instance, whose
    per-instance state tracks consecutive same-event-type RUNS and
    ``terminate()`` flushes the last one. This is the sequential-state
    shape (streak detection, sessionless run-length encoding) expressed
    as a declared table function instead of a hand-rolled
    applyInPandas fold: the PARTITION BY/ORDER BY contract lives in the
    query text, the engine owns the exchange and the sort, and the
    function body is three lines of state. Oracle = the gaps-and-islands
    relational replay of the same runs."""
    from pyspark.sql.functions import udtf

    from ..catalog import register_views

    @udtf(returnType="user_id bigint, event_type string, run_len bigint")
    class Streaks:
        def __init__(self):
            self._user = None
            self._type = None
            self._n = 0

        def eval(self, row):
            # flush on USER change too, not just type change: one UDTF
            # instance can see several PARTITION BY groups back-to-back
            # (Spark funnels multiple hash partitions through one task's
            # instance), and relying on terminate() per group merges a
            # run across users whose edge types happen to match — caught
            # by the sf0.1 oracle as n_runs short by exactly those
            # boundaries while n_events stayed intact
            if self._n and (
                row["user_id"] != self._user or row["event_type"] != self._type
            ):
                yield (self._user, self._type, self._n)
                self._n = 0
            self._user, self._type = row["user_id"], row["event_type"]
            self._n += 1

        def terminate(self):
            if self._n:
                yield (self._user, self._type, self._n)
            self._user = self._type = None
            self._n = 0

    spark.udtf.register("event_streaks", Streaks)
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_runs,
               CAST(MAX(run_len) AS BIGINT) AS max_run,
               CAST(SUM(run_len) AS BIGINT) AS n_events
        FROM event_streaks(
          TABLE(SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
                       event_id
                FROM events)
          PARTITION BY user_id ORDER BY (ts, event_id))
        GROUP BY event_type
        """
    )


_ITER_UDF_SQL = """
SELECT o_orderpriority AS priority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT) % 97) AS BIGINT)
         AS scored_checksum
FROM orders
GROUP BY 1
"""


@register("u10_pandas_iter_udf", oracle=_ITER_UDF_SQL, tags=("U2",), doc="")
def u10_pandas_iter_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterator-of-Series pandas UDF (`Iterator[pd.Series] ->
    Iterator[pd.Series]`) — the EXPENSIVE-INIT variant of the Arrow UDF
    matrix: the function body runs ONCE per partition (load the model /
    tokenizer / compiled regex there), then streams Arrow batches
    through the hot loop, where a plain `@pandas_udf` would re-enter
    per batch with no init point at all. The init here is a stand-in
    scoring table (a 97-entry modulus map, built once per function-body
    entry). What the in-query assert pins is the DENOMINATOR of the
    amortization claim — the input is exactly 8 partitions (= tasks =
    init scopes); the init-count-equals-task-count contract itself is
    pinned by an accumulator-instrumented unit test
    (tests/test_r12_additions.py::test_iter_udf_init_once_per_task).
    Score = floor(price*100) %% 97 — integer math, so the oracle
    recomputes it relationally. At 100 TB this pattern is the
    difference between loading a 2 GB model 10^6 times (per batch) and
    200 times (per partition)."""
    o = T(spark, sf_dir, "orders").repartition(8, "o_orderkey")
    n_parts = o.rdd.getNumPartitions()

    @F.pandas_udf("long")
    def score(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        # expensive init: once per PARTITION (task), not per Arrow batch
        lut = {i: i for i in range(97)}  # stand-in for a model load
        import os as _os

        yield_count = 0
        for prices in batches:
            yield_count += 1
            yield ((prices * 100).astype("int64").floordiv(1) % 97).map(lut).astype(
                "int64"
            )
        _ = (_os.getpid(), yield_count)  # init scope ends with the task

    scored = o.select(
        F.col("o_orderpriority").alias("priority"), score("o_totalprice").alias("s")
    )
    out = scored.groupBy("priority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("s").cast("bigint").alias("scored_checksum"),
    )
    assert n_parts == 8  # the init amortizes over exactly these tasks
    return out


_ARROW_UDF_SQL = """
SELECT CAST(STRING_SPLIT(o_orderpriority, '-')[1] AS BIGINT) AS tier,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(o_orderkey % 997) AS BIGINT) AS key_mod_mass
FROM orders
GROUP BY 1
"""


@register("u11_arrow_scalar_udf", oracle=_ARROW_UDF_SQL, tags=("U2", "U1"), doc="")
def u11_arrow_scalar_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARROW-OPTIMIZED scalar Python UDF (`@udf(..., useArrow=True)`,
    Spark 3.5+/4 — the THIRD Python scalar eval type beside U1's
    row-at-a-time pickle UDF and U2's pandas-Series UDF): the function
    still receives one value per call (so U1 code ports unchanged —
    the migration story that matters), but batches cross the JVM/Python
    boundary as Arrow record batches instead of pickled rows, cutting
    the serialization tax without rewriting to vectorized pandas. The
    UDF parses the numeric tier off '3-MEDIUM'-style priorities — a
    deterministic pure-string computation the DuckDB oracle mirrors
    with STRING_SPLIT, so the hash match pins eval-type semantics
    (null passthrough included), not just plumbing. Aggregation keys
    on the UDF output; the modular key checksum keeps everything
    integer. Scale note: like every Python eval path this stays OFF
    hot loops — it exists as the inventory's migration-path row, with
    the batch-transfer economics documented here."""
    from pyspark.sql.functions import udf

    @udf("bigint", useArrow=True)
    def tier_of(priority):
        if priority is None:
            return None
        return int(priority.split("-")[0])

    o = T(spark, sf_dir, "orders")
    return (
        o.select(
            tier_of(F.col("o_orderpriority")).alias("tier"),
            (F.col("o_orderkey") % 997).alias("km"),
        )
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum("km").cast("bigint").alias("key_mod_mass"),
        )
    )


_MAP_IN_ARROW_SQL = """
SELECT l_returnflag AS flag,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,4))), 2)
            AS DOUBLE) AS net_revenue
FROM lineitem
WHERE l_quantity >= 10
GROUP BY 1
"""


@register("u12_map_in_arrow", oracle=_MAP_IN_ARROW_SQL, tags=("U2", "U3"), doc="")
def u12_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInArrow`` — the LOWEST-overhead Python eval lane (Spark
    3.4+/4) and the last cell of the UDF matrix: the function receives
    an ITERATOR of raw ``pyarrow.RecordBatch``es (no pandas
    materialization at all — u10's iterator ergonomics without the
    pandas conversion tax) and yields batches back. This is the lane
    for columnar kernels that speak Arrow natively (tokenizers, codecs,
    Arrow-compute pipelines): here the per-batch kernel filters
    qty >= 10 and computes net = price·(1−discount) with
    ``pyarrow.compute`` — IEEE doubles bit-identical to the SQL
    expression, so the DuckDB oracle runs the plain SQL form and the
    hash pins the semantics (the exact-decimal cast happens JVM-side
    after the kernel, per the a1 money discipline). Batch shape is
    partition-streaming: memory is one Arrow batch, never a partition."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def kernel(batches):
        for batch in batches:
            t = pa.Table.from_batches([batch])
            t = t.filter(pc.greater_equal(t.column("l_quantity"), pa.scalar(10.0)))
            net = pc.multiply(
                t.column("l_extendedprice"),
                pc.subtract(pa.scalar(1.0), t.column("l_discount")),
            )
            out = pa.table(
                {"flag": t.column("l_returnflag"), "net": net}
            )
            for b in out.to_batches():
                yield b

    l = T(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice", "l_discount"
    )
    mapped = l.mapInArrow(kernel, "flag string, net double")
    return mapped.groupBy("flag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        F.round(F.sum(F.col("net").cast("decimal(25,4)")), 2)
        .cast("double")
        .alias("net_revenue"),
    )


@register("x_tdigest_quantiles", oracle=None, tags=("U3", "A3", "F3"), doc="")
def x_tdigest_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile sketch (`operators/tdigest.py`): shard
    lineitem prices by content hash, compress each shard to ~δ/2
    centroids (k1 scale — tail-weighted resolution), merge the
    config-bounded centroid set, and read 5 quantiles off the digest.
    This is the persist-and-merge percentile pattern (DataSketches /
    Spark's own approx_percentile internals, but as a STORABLE
    artifact): day N+1 merges into day N's digest without rescanning
    day N. Rows-only by design — centroid placement is
    algorithm-specific (no SQL oracle can reproduce it); the rank-error
    contract (≤0.5% at the 1%/99% tails, ≤1.5% at quartiles),
    layout-independent bit-determinism, and merge-vs-monolithic
    consistency are pinned by tests/test_tdigest.py. Exact SQL siblings
    for value parity: x_exact_median / x_weighted_quantiles."""
    from ..operators.tdigest import (
        build_tdigest,
        merge_tdigest,
        quantiles_from_digest,
    )

    l = T(spark, sf_dir, "lineitem")
    digest = merge_tdigest(build_tdigest(l, "l_extendedprice"))
    return quantiles_from_digest(digest, [0.01, 0.25, 0.5, 0.75, 0.99]).select(
        F.col("q"), F.round(F.col("estimate"), 4).alias("estimate")
    )


_TDIGEST_BOUND_SQL = """
SELECT CAST(q AS DOUBLE) AS q, within_bound
FROM (VALUES (0.01, TRUE), (0.25, TRUE), (0.5, TRUE), (0.75, TRUE),
             (0.99, TRUE)) AS t(q, within_bound)
"""


@register("x_tdigest_error_bound", oracle=_TDIGEST_BOUND_SQL, tags=("U3", "A3", "F3"), doc="")
def x_tdigest_error_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The t-digest accuracy contract as a DRIVER-CHECKED fact: estimate
    5 quantiles from the sketch, measure each estimate's TRUE rank with
    one exact aggregation pass (count of values ≤ estimate — the 5-row
    estimate table broadcasts, the fact table is scanned once), and
    emit whether the rank error is inside the documented bound (≤0.5%
    of N at the 1%/99% tails, ≤1.5% at the quartiles). The sketch is
    bit-deterministic (content-hash sharding), so the booleans are
    stable facts and the oracle is the constant TRUE grid — a red row
    here means the sketch's error contract broke, checked by the
    external gate rather than only by unit tests. This is the
    rows-only-to-SQL-green bridge pattern for sketches: pin the
    CONTRACT, not the algorithm-specific internals."""
    from ..operators.tdigest import (
        build_tdigest,
        merge_tdigest,
        quantiles_from_digest,
    )

    l = T(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").cast("double").alias("v")
    )
    digest = merge_tdigest(build_tdigest(l, "v"))
    est = quantiles_from_digest(digest, [0.01, 0.25, 0.5, 0.75, 0.99])
    scored = l.crossJoin(F.broadcast(est)).groupBy("q", "estimate").agg(
        F.count_if(F.col("v") <= F.col("estimate")).alias("rank"),
        F.count(F.lit(1)).alias("n"),
    )
    err = (F.col("rank") - F.col("q") * F.col("n")) / F.col("n")
    bound = F.when(
        (F.col("q") <= 0.01) | (F.col("q") >= 0.99), F.lit(0.005)
    ).otherwise(F.lit(0.015))
    return scored.select(
        "q", (F.abs(err) <= bound).alias("within_bound")
    )


_TDIGEST_GROUPED_SQL = """
SELECT flag, CAST(q AS DOUBLE) AS q, within_bound
FROM (SELECT DISTINCT l_returnflag AS flag FROM lineitem) f
CROSS JOIN (VALUES (0.5, TRUE), (0.9, TRUE)) AS t(q, within_bound)
"""


@register("x_tdigest_grouped_bound", oracle=_TDIGEST_GROUPED_SQL, tags=("U3", "A3", "A1"), doc="")
def x_tdigest_grouped_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-GROUP sketching — the segment-percentile pattern at scale:
    one t-digest per (return flag, content shard), shard digests
    collapsed per group, median and P90 read per group, and each
    estimate's TRUE within-group rank measured by one exact pass (the
    3x2 estimate grid broadcasts; the fact table is scanned once,
    grouped by flag). Groups scale out (one digest chain per segment),
    shards parallelize within a group, and the per-group state stays
    config-bounded — the shape that answers 'P90 latency per tenant'
    over 10^4 tenants without a single global sort. Oracle = the
    constant TRUE grid over the distinct flags: a red row means a
    group's sketch broke its ≤1.5%-of-group-N rank-error contract under
    the external gate."""
    from ..operators.tdigest import (
        build_tdigest_grouped,
        merge_tdigest_grouped,
        quantiles_from_digest_grouped,
    )

    l = T(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_extendedprice").cast("double").alias("v"),
    )
    digests = merge_tdigest_grouped(
        build_tdigest_grouped(l, "v", ["flag"]), ["flag"]
    )
    est = quantiles_from_digest_grouped(digests, [0.5, 0.9], ["flag"])
    scored = (
        l.join(F.broadcast(est), "flag")
        .groupBy("flag", "q", "estimate")
        .agg(
            F.count_if(F.col("v") <= F.col("estimate")).alias("rank"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    err = (F.col("rank") - F.col("q") * F.col("n")) / F.col("n")
    return scored.select(
        "flag", "q", (F.abs(err) <= F.lit(0.015)).alias("within_bound")
    )


_HLL_BOUND_SQL = """
SELECT o_orderstatus AS status,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_customers,
       TRUE AS within_bound
FROM orders
GROUP BY 1
"""


@register("x_hll_error_bound", oracle=_HLL_BOUND_SQL, tags=("A3", "A2"), doc="")
def x_hll_error_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HLL++ accuracy contract as a driver-checked fact (the same
    rows-only→SQL-green bridge as x_tdigest_error_bound, applied to
    a3_approx_count_distinct): per order status, compute BOTH the
    sketch estimate (rsd 0.02) and the exact distinct count in one
    aggregate, emit the exact count plus whether the estimate sits
    inside 3·rsd. The sketch is hash-based and RNG-free, so the boolean
    is a stable deterministic fact; the oracle recomputes the exact
    count and states TRUE. A red row = Spark's HLL++ broke its own
    error bound on this data. The estimate itself stays out of the
    output (engine-specific), which is exactly why a3 is rows-only —
    this leg pins the part an external engine CAN check."""
    o = T(spark, sf_dir, "orders")
    g = o.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.approx_count_distinct("o_custkey", 0.02).alias("approx"),
        F.countDistinct("o_custkey").cast("bigint").alias("exact_customers"),
    )
    err = (F.col("approx") - F.col("exact_customers")).cast("double") / F.col(
        "exact_customers"
    )
    return g.select(
        "status",
        "exact_customers",
        (F.abs(err) <= F.lit(0.06)).alias("within_bound"),
    )
