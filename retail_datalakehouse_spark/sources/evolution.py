"""Schema evolution (SURVEY §1.2 — an explicit [E] reference behavior).

The reference configures its crawlers with ``SchemaChangePolicy=
{UpdateBehavior: UPDATE_IN_DATABASE, DeleteBehavior: DEPRECATE_IN_DATABASE}``
(``/root/reference/glue_infra.py:101-104``): new/changed columns update the
catalog; removed columns are *deprecated* (kept, nullable) — never dropped.

Spark re-expression:

- **UPDATE**: read the multi-version data with ``mergeSchema`` — the
  unified schema is the union of all file schemas; older files yield NULL
  for columns they predate.
- **DEPRECATE**: when a newer batch *drops* a column, the unified view
  keeps the column (from older files) and the new rows carry NULL — the
  exact deprecate-not-drop semantics. ``evolved_view`` makes that explicit
  and also reports each column's status.

Type widening across versions (int→long, float→double) is resolved to the
wider type, mirroring crawler behavior on numeric drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_evolved(spark: SparkSession, path: str) -> DataFrame:
    """Union-of-schemas read over a directory of heterogeneous parquet
    batches (`mergeSchema` — per-file footers reconciled)."""
    return spark.read.option("mergeSchema", True).parquet(path)


def append_batch(df: DataFrame, path: str) -> None:
    """Append a batch whose schema may differ from earlier batches."""
    df.write.mode("append").parquet(path)


def schema_report(spark: SparkSession, path: str) -> DataFrame:
    """Catalog-style column report over an evolved table: for each column
    of the unified schema, whether the LATEST batch still carries it
    (`active`) or it only survives from older batches (`deprecated`) —
    the UPDATE_IN_DATABASE / DEPRECATE_IN_DATABASE split."""
    import os

    unified = read_evolved(spark, path)
    files = sorted(
        (os.path.getmtime(os.path.join(path, f)), os.path.join(path, f))
        for f in os.listdir(path)
        if f.endswith(".parquet")
    )
    latest_cols = set(spark.read.parquet(files[-1][1]).columns) if files else set()
    rows = [
        (c, t, "active" if c in latest_cols else "deprecated")
        for c, t in unified.dtypes
    ]
    return spark.createDataFrame(rows, ["column_name", "data_type", "status"])
