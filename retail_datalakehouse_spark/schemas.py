"""Explicit StructTypes (SURVEY §1.3–§1.4).

The reference declares no schemas anywhere — Glue crawlers infer them from
raw CSVs (``/root/reference/glue_infra.py:95-106``). Our engine inverts
that: inference is allowed ONLY in the raw zone; bronze onward pins these
explicit schemas (type drift becomes an error, not silent corruption).

Retail star (typed per the crawler-inferred surface, SURVEY §1.4):
- orders: ``datasets/orders_2024-06-06.csv:1``
- order_items: ``datasets/order_items_2024-06-06.csv:1``
- products: ``datasets/products.csv:1-2`` — 4-name header over 5-field
  rows; the unnamed 2nd field is the Instacart aisle_id. ALWAYS read with
  this 5-column schema (SURVEY §7 watch-list #2).
"""

from __future__ import annotations

from pyspark.sql import types as T

ORDERS = T.StructType(
    [
        T.StructField("order_num", T.LongType()),
        T.StructField("order_id", T.LongType(), nullable=False),
        T.StructField("user_id", T.LongType()),
        T.StructField("order_timestamp", T.TimestampType()),
        T.StructField("total_amount", T.DoubleType()),
        T.StructField("date", T.DateType()),
    ]
)

ORDER_ITEMS = T.StructType(
    [
        T.StructField("id", T.LongType(), nullable=False),
        T.StructField("order_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("days_since_prior_order", T.DoubleType()),  # 765 NULLs in ref
        T.StructField("product_id", T.LongType()),
        T.StructField("add_to_cart_order", T.IntegerType()),
        T.StructField("reordered", T.IntegerType()),  # {0,1} → bool in silver
        T.StructField("order_timestamp", T.TimestampType()),
        T.StructField("date", T.DateType()),
    ]
)

PRODUCTS = T.StructType(
    [
        T.StructField("product_id", T.LongType(), nullable=False),
        T.StructField("aisle_id", T.LongType()),  # unnamed 5th field in the header
        T.StructField("department_id", T.LongType()),
        T.StructField("department", T.StringType()),
        T.StructField("product_name", T.StringType()),
    ]
)
