"""The medallion pipeline: raw → bronze → silver → gold (SURVEY §0.2).

The reference names the four zones (``/root/reference/s3_bucket.py:8-13``)
but only populates raw; the refinement semantics are the standard lakehouse
contract SURVEY §0 assigns them:

- **bronze**: typed (explicit schema), exact-deduped append — re-ingest of
  the same file is a no-op (idempotency theme, ``s3_bucket.py:33-37``).
- **silver**: conformed + UPSERTED — correction files
  (``orders_2024-06-06-Updated.csv``) MERGE on the business key;
  ``reordered`` 0/1 → boolean, timestamps normalized.
- **gold**: joined + aggregated marts over the star — LEFT joins to the
  products dim (the reference's broken FK: 116/133 product_ids missing,
  SURVEY §1.3 — an inner join silently drops ~87% of item lines).

Each zone is a date-partitioned parquet table; every stage is a pure
DataFrame transform so the same code runs batch (this module) or per
micro-batch via ``foreachBatch`` (streaming/jobs.py).

Scale: bronze dedup shuffles on the business key once; silver MERGE
broadcasts the (small) correction batch; gold marts broadcast the products
dim. All date filters prune partitions.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import schemas
from ..operators.dedup import dedup_keep_first
from ..operators.merge import merge_upsert
from ..sources.csv import read_csv_explicit, read_daily_files


class MedallionPipeline:
    """Runs the reference's lakehouse flow end-to-end over CSV drops."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    def _zone(self, zone: str, table: str) -> str:
        return os.path.join(self.root, zone, table)

    # ------------------------------------------------------------- bronze

    def bronze_orders(self, raw_dir: str) -> DataFrame:
        """Typed + deduped append: explicit schema, survivor = lowest
        order_num per order_id (deterministic re-ingest safety)."""
        raw = read_daily_files(self.spark, raw_dir, schemas.ORDERS)
        return dedup_keep_first(raw, keys=["order_id"], order_by=["order_num"]).drop(
            "ingest_date"
        )

    def bronze_order_items(self, raw_dir: str) -> DataFrame:
        raw = read_daily_files(self.spark, raw_dir, schemas.ORDER_ITEMS)
        return dedup_keep_first(raw, keys=["id"], order_by=["order_id"]).drop("ingest_date")

    def bronze_products(self, path: str) -> DataFrame:
        """The malformed-header dimension: explicit 5-col schema (S2)."""
        return read_csv_explicit(self.spark, path, schemas.PRODUCTS)

    # ------------------------------------------------------------- silver

    def silver_orders(self, bronze: DataFrame, corrections: DataFrame | None) -> DataFrame:
        """Conform + MERGE corrections on order_id (S7)."""
        conformed = bronze.withColumn("total_amount", F.round("total_amount", 2))
        if corrections is None:
            return conformed
        corr = corrections.withColumn("total_amount", F.round("total_amount", 2))
        return merge_upsert(conformed, corr, keys=["order_id"])

    def silver_order_items(self, bronze: DataFrame) -> DataFrame:
        return bronze.withColumn("reordered", F.col("reordered") == 1)

    # --------------------------------------------------------------- gold

    def gold_daily_revenue(self, silver_orders: DataFrame) -> DataFrame:
        return silver_orders.groupBy("date").agg(
            F.round(F.sum(F.col("total_amount").cast("decimal(25,2)")), 2)
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("user_id").alias("n_users"),
        )

    def gold_department_sales(
        self, silver_items: DataFrame, products: DataFrame
    ) -> DataFrame:
        """LEFT join to the dim — orphan item lines (broken FK) are kept
        under department 'UNKNOWN' instead of silently dropped."""
        joined = silver_items.join(F.broadcast(products), "product_id", "left")
        return joined.groupBy(
            F.coalesce(F.col("department"), F.lit("UNKNOWN")).alias("department")
        ).agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.when(F.col("reordered"), 1).otherwise(0)).alias("n_reorders"),
        )

    def gold_repeat_customers(self, silver_orders: DataFrame) -> DataFrame:
        return (
            silver_orders.groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.round(F.sum(F.col("total_amount").cast("decimal(25,2)")), 2)
                .cast("double")
                .alias("total_spend"),
            )
            .filter(F.col("n_orders") > 1)
        )

    # ------------------------------------------------------------ end-to-end

    def run(
        self,
        orders_raw_dir: str,
        items_raw_dir: str,
        products_csv: str,
        corrections_csv: str | None = None,
        write: bool = False,
    ) -> dict[str, DataFrame]:
        """Full raw→gold run; optionally persists each zone date-partitioned."""
        b_orders = self.bronze_orders(orders_raw_dir)
        b_items = self.bronze_order_items(items_raw_dir)
        b_products = self.bronze_products(products_csv)

        corrections = (
            read_csv_explicit(self.spark, corrections_csv, schemas.ORDERS)
            if corrections_csv
            else None
        )
        s_orders = self.silver_orders(b_orders, corrections)
        s_items = self.silver_order_items(b_items)

        out = {
            "bronze_orders": b_orders,
            "bronze_order_items": b_items,
            "bronze_products": b_products,
            "silver_orders": s_orders,
            "silver_order_items": s_items,
            "gold_daily_revenue": self.gold_daily_revenue(s_orders),
            "gold_department_sales": self.gold_department_sales(s_items, b_products),
            "gold_repeat_customers": self.gold_repeat_customers(s_orders),
        }
        if write:
            for name, df in out.items():
                zone = name.split("_", 1)[0]
                table = name.split("_", 1)[1]
                part = ["date"] if "date" in df.columns else []
                w = df.write.mode("overwrite")
                if part:
                    w = w.partitionBy(*part)
                w.parquet(self._zone(zone, table))
        return out
