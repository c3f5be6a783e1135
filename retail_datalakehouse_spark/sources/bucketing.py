"""Bucketed tables: pre-shuffled storage for zero-exchange co-located joins
(SURVEY §4 scale notes; the Spark-native analogue of the reference's
partitioned S3 layout, `s3_bucket.py:43-70`, taken one step further).

A 100 TB fact⋈fact join's dominant cost is shuffling BOTH sides on the join
key every time the join runs. Bucketing pays that shuffle ONCE at write
time: ``df.write.bucketBy(n, key).sortBy(key)`` hash-partitions rows into a
fixed number of files per the key, and records the layout in the catalog.
Two tables bucketed on the same key with the same bucket count then
sort-merge-join with NO Exchange on either side — the scan itself delivers
co-located, pre-sorted partitions. This is the single biggest repeated-join
optimization available to a lakehouse: every daily orders⋈lineitem run
skips two full-table shuffles.

Bucketed tables must go through the catalog (``saveAsTable``) — the bucket
layout lives in table metadata, not the files — so the helpers here create
EXTERNAL tables (explicit ``path``) in scratch space and never touch the
repo or testdata.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: Sequence[str],
    n_buckets: int,
    path: str,
) -> None:
    """Write ``df`` as an external bucketed parquet table named ``table``
    at ``path``: bucketed AND sorted by ``keys`` so downstream merge joins
    need neither Exchange nor Sort. Overwrites any previous registration
    (idempotent re-runs)."""
    keys = list(keys)
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # One write task per bucket (repartition uses the same Murmur3 hash as
    # the bucket-file assignment) → exactly one file per bucket, which is
    # what lets the scan report its sort order and drop the join-side Sort.
    df = df.repartition(n_buckets, *[F.col(k) for k in keys])
    (
        df.write.mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, keys[0], *keys[1:])
        .sortBy(keys[0], *keys[1:])
        .format("parquet")
        .saveAsTable(table)
    )


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Join two co-bucketed catalog tables on their bucket keys. With equal
    bucket counts the plan is a SortMergeJoin whose children are bare
    bucketed scans — no Exchange, no Sort (``.explain`` proves it; see
    tools/explain_audit.py). The merge hint pins SMJ so a small test-scale
    side isn't broadcast, which would hide the layout win being tested."""
    # One-file-per-bucket sorted scans can report their ordering (drops the
    # join-side Sorts); Spark gates this behind a legacy conf because the
    # one-file check costs a listing. Left set for the lazy plan's sake —
    # callers that materialize should save/restore it around the action.
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    left = spark.table(left_table).hint("merge")
    right = spark.table(right_table)
    return left.join(right, on=list(on), how=how)
