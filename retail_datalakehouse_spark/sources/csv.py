"""CSV ingestion (SURVEY §2.1 S1–S3).

The reference's raw zone is CSV-in-S3 with filename-encoded date partitions
(``/root/reference/s3_bucket.py:43-70``): files route to
``transactional/<table>/<YYYY-MM-DD>/`` via regex ``(\\d{4}-\\d{2}-\\d{2})``
(:51), dimensions to ``product/`` (:60-61), everything else to ``misc/``
(:63-64). Schema comes from Glue crawler inference (``glue_infra.py:95-106``).

Spark re-expression: one declarative read + partitioned write — the date is
extracted from ``input_file_name()`` with the same regex, and the write is
``partitionBy(date)``, which gives partition pruning for free (no key-string
arithmetic, no per-file upload loop).

The malformed-header case: ``datasets/products.csv`` declares 4 header names
over 5-field rows (SURVEY §1.3) — a header-keyed reader mis-shifts columns.
``read_csv_explicit`` reads with a full-width explicit StructType and
``header=True`` (line 1 skipped, never trusted).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

DATE_IN_FILENAME = r"(\d{4}-\d{2}-\d{2})"


def read_csv_inferred(spark: SparkSession, path: str) -> DataFrame:
    """S1: header + inferred schema — the crawler-inference analogue.
    Raw-zone only; bronze onward uses explicit schemas (SURVEY §1.4)."""
    return spark.read.option("header", True).option("inferSchema", True).csv(path)


def read_csv_explicit(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """S2: explicit schema, tolerant of a header narrower than the rows.

    ``header=True`` only skips the first line; column identity comes from
    ``schema`` position, so a 4-name header over 5-field rows reads
    correctly (the products.csv trap).
    """
    return spark.read.schema(schema).option("header", True).csv(path)


def read_daily_files(spark: SparkSession, glob: str, schema: StructType | None = None) -> DataFrame:
    """S3 read side: ingest a directory of daily drop files, deriving the
    partition date from each filename — same regex as `s3_bucket.py:51`."""
    reader = spark.read.option("header", True)
    reader = reader.schema(schema) if schema else reader.option("inferSchema", True)
    return reader.csv(glob).withColumn(
        "ingest_date",
        F.to_date(F.regexp_extract(F.input_file_name(), DATE_IN_FILENAME, 1)),
    )


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str], fmt: str = "parquet") -> None:
    """S3 write side: date-partitioned columnar layout → Catalyst partition
    pruning replaces the reference's key-prefix routing."""
    df.write.mode("overwrite").partitionBy(*partition_cols).format(fmt).save(path)
