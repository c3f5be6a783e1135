"""Deduplication operators (SURVEY §2.6 O4, §2.10 L1–L2).

The reference's ingest is idempotent-by-exception (`s3_bucket.py:33-37`);
re-ingest safety at engine level means dedup. Three tiers, all shuffle-aware:

- exact dedup on keys with a *deterministic* survivor (row_number, not
  `dropDuplicates` whose survivor depends on partition order);
- content-hash dedup for wide rows / documents (hash first → tiny shuffle);
- near-dedup via MinHash-LSH / SimHash (see `minhash.py` companions below).

At 100 TB: the row_number window shuffles once on the dedup keys — identical
cost to groupBy — and hash-dedup shuffles only (hash, id), not the payload.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedup_keep_first(
    df: DataFrame, keys: Sequence[str], order_by: Sequence
) -> DataFrame:
    """Keep exactly one row per key, chosen by an explicit total order.

    Deterministic alternative to ``dropDuplicates(keys)``: the survivor is
    the first row under ``order_by`` (column names sort ascending; Column
    expressions are used as-is, so pass ``F.col(c).desc()`` for latest-
    wins), so replays and partition reshuffles always pick the same row.
    One shuffle on ``keys``.
    """
    order = [F.col(c).asc() if isinstance(c, str) else c for c in order_by]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def dedup_exact_content(
    df: DataFrame, content_col: str, id_col: str
) -> DataFrame:
    """Exact content dedup (L1): keep the minimum-id row per distinct
    content value, comparing via sha2-256 so the shuffle moves a 64-char
    digest instead of the full payload. Survivor = min(id) — deterministic.
    """
    hashed = df.withColumn("__h", F.sha2(F.col(content_col), 256))
    return dedup_keep_first(hashed, keys=["__h"], order_by=[id_col]).drop("__h")
