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


def duplicate_span_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 10
) -> DataFrame:
    """Duplicate-span detection (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better"): slide a word ``n``-gram
    window over every document and flag each position whose span — matched
    by its 64-bit ``xxhash64`` DIGEST, not by span text (collision
    probability 2^-64 per pair; see the scale note below) — occurs >= 2
    times anywhere in the corpus (any document, any position — including
    elsewhere in the same document). Returns one row per input
    document: ``(id, n_spans, n_dup_spans)``; short documents (< n words)
    report 0/0.

    Scale shape: two shuffles — one groupBy for the corpus-wide span
    frequency table, one groupBy back to documents — both on the span's
    ``xxhash64`` DIGEST, so the wire moves 8-byte longs instead of
    ~60-byte strings (span text never shuffles; it dies in the map stage
    right after hashing). A digest collision (2^-64 per pair, ~1e-8 over
    a trillion-span corpus) would merge two span families — below corpus
    noise, the standard Lee-et-al engineering trade. Cap span explosion
    with a stride > 1 when position-exactness isn't needed — the
    suffix-array approximation trade-off.
    """
    from .text import tokens

    t = tokens(F.col(text_col))
    npos = F.size(t) - F.lit(n - 1)
    # sequence(1, k) DESCENDS when k < 1 — guard short docs to an empty list.
    positions = F.when(npos >= 1, F.sequence(F.lit(1), npos)).otherwise(
        F.expr("CAST(array() AS ARRAY<INT>)")
    )
    # digest INSIDE the map-side lambda: the per-position array already
    # holds 8-byte longs, so span text never leaves its task
    spans = F.transform(
        positions, lambda i: F.xxhash64(F.concat_ws(" ", F.slice(t, i, n)))
    )
    # r14 opt: fan_out before the explode — a single-split input (the
    # sf0.1 documents table is one parquet split) serialized BOTH span
    # explodes on one task (guide §2.5 input skew; no-op when the scan
    # is already parallel). Measured 3.1 s → 1.3 s for the full stats.
    # A count-over-Window(span) would save the second explode but puts
    # every instance of a hot boilerplate span in ONE window task that
    # AQE cannot split — the groupBy+join keeps partial aggregation and
    # AQE skew-join splitting at 100 TB (guide §2.5).
    from .parallelism import fan_out

    # r15: an aggregate-first variant (groupBy (span, id) before the
    # frequency join, as l4_boilerplate_removal now does) was measured and
    # REVERTED: spans here are ~unique per (span, id), so the extra
    # aggregation phase saves nothing and costs ~15-20% at bench scale
    # (interleaved min-of-4: old 1.72 s vs new 2.06 s at sf0.1; ~equal at
    # sf1). The instance-level join-back stays.
    w = fan_out(df).select(F.col(id_col), F.explode(spans).alias("span"))
    counts = w.groupBy("span").agg(F.count(F.lit(1)).alias("__c"))
    perdoc = (
        w.join(counts, "span")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum((F.col("__c") >= 2).cast("long")).alias("n_dup_spans"),
        )
    )
    return df.select(id_col).join(perdoc, id_col, "left").select(
        id_col,
        F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
        F.coalesce("n_dup_spans", F.lit(0)).cast("long").alias("n_dup_spans"),
    )
