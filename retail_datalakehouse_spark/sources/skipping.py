"""File-level min/max data skipping (Delta/Iceberg file statistics on
plain parquet — SURVEY §4 scan-pruning; reference behavior: the crawler's
partition metadata at `glue_crawler.py` is directory-grain, this is the
file-grain refinement every production lakehouse layers on top).

The mechanism that makes selective queries cheap at 100 TB is not the
scan — it is NOT scanning: when data is written clustered on a key
(range-repartitioned or Z-ordered), each file covers a narrow key range,
and a per-file [min, max] stats table lets the reader drop whole files
before Spark ever opens them. Parquet footers already hold per-row-group
min/max, so stats collection is a driver-side metadata read (exactly what
Delta records in its commit log as `stats`), never a data scan.

Spark's own parquet reader does row-group-level skipping INSIDE files it
opens; this module adds the file-level layer that avoids opening (and at
cloud scale, listing/fetching) them at all — the reader receives an
explicit pruned file list, so the win shows up as fewer scan splits, not
just filtered row groups.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def write_clustered(
    df: DataFrame, path: str, cluster_col: str, n_files: int = 16
) -> None:
    """Write ``df`` range-clustered on ``cluster_col`` into ``n_files``
    files — the layout that makes min/max skipping effective (random
    layout gives every file the full key range; clustered layout gives
    each file 1/n of it)."""
    df.repartitionByRange(n_files, cluster_col).write.mode("overwrite").parquet(path)


def collect_file_stats(path: str, cols: list[str]) -> list[dict]:
    """Per-file [min, max] for ``cols`` from parquet FOOTERS — a
    driver-side metadata read, no Spark job, no data pages touched (the
    footers were written with the data; Delta stores the same numbers in
    its transaction log). Returns one dict per data file:
    {"file", "n_rows", "<col>_min", "<col>_max", ...}."""
    import pyarrow.parquet as pq

    out = []
    for f in sorted(os.listdir(path)):
        if not f.endswith(".parquet"):
            continue
        md = pq.read_metadata(os.path.join(path, f))
        names = md.schema.names
        entry: dict = {"file": f, "n_rows": md.num_rows}
        for c in cols:
            ci = names.index(c)
            lo = hi = None
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(ci).statistics
                if st is None or not st.has_min_max:
                    lo = hi = None
                    break
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            entry[f"{c}_min"], entry[f"{c}_max"] = lo, hi
        out.append(entry)
    return out


def skipping_scan(
    spark: SparkSession,
    path: str,
    stats: list[dict],
    col: str,
    lo,
    hi,
) -> tuple[DataFrame, int, int]:
    """Range scan ``col BETWEEN lo AND hi`` that reads ONLY the files whose
    [min, max] overlaps the predicate. A file with unknown stats (None) is
    conservatively kept. Returns (df, n_files_read, n_files_total); the
    residual filter still applies inside the surviving files (file grain
    is coarser than row grain)."""
    keep = [
        s["file"]
        for s in stats
        if s[f"{col}_min"] is None or not (s[f"{col}_max"] < lo or s[f"{col}_min"] > hi)
    ]
    from pyspark.sql import functions as F

    if not keep:  # predicate outside the table's range: empty, zero reads
        empty = spark.read.parquet(path).filter(F.lit(False))
        return empty, 0, len(stats)
    df = spark.read.parquet(*[os.path.join(path, f) for f in keep]).filter(
        (F.col(col) >= lo) & (F.col(col) <= hi)
    )
    return df, len(keep), len(stats)


def build_file_bloom_stats(
    spark: SparkSession, path: str, col: str, m_bits: int = 1 << 16, k: int = 3
) -> dict[str, list[int]]:
    """Per-FILE Bloom filters over ``col`` — value-grain skipping where
    zone maps fail: a point lookup on a column UNCORRELATED with the
    clustering key finds every file's [min,max] spanning the whole domain
    (no pruning), while a per-file bloom prunes to the files that can
    contain the value (parquet's own optional bloom-filter feature,
    implemented as a stats layer the reader owns). Built in ONE
    distributed pass: hash per row, k bit positions, per-(file, word)
    ``bit_or`` aggregation — the stats table is files x (m/64) int64
    words, collected driver-side like the min/max stats."""
    from pyspark.sql import functions as F

    from ..operators.bloom import shingle_hash

    df = spark.read.parquet(path).select(
        F.input_file_name().alias("__f"), F.col(col)
    )
    h = shingle_hash(F.col(col).cast("string"))
    h1 = F.pmod(h, F.lit(m_bits))
    h2 = F.pmod(F.shiftrightunsigned(h, 17).bitwiseOR(F.lit(1)), F.lit(m_bits))
    pos = F.explode(
        F.array(*[F.pmod(h1 + F.lit(i) * h2, F.lit(m_bits)) for i in range(k)])
    ).alias("pos")
    words = (
        df.select("__f", pos)
        .groupBy("__f", (F.col("pos") / 64).cast("int").alias("w_idx"))
        .agg(
            F.bit_or(
                F.call_function(
                    "shiftleft", F.lit(1).cast("long"), F.pmod("pos", F.lit(64)).cast("int")
                )
            ).alias("word")
        )
        .collect()
    )
    out: dict[str, list[int]] = {}
    for r in words:
        fname = os.path.basename(r["__f"])
        out.setdefault(fname, [0] * (m_bits // 64))[r.w_idx] = r.word
    return out


def bloom_lookup_files(
    spark: SparkSession,
    blooms: dict[str, list[int]],
    value,
    m_bits: int = 1 << 16,
    k: int = 3,
) -> list[str]:
    """Files that MAY contain ``value`` (no false negatives): compute the
    probe's k bit positions with the same Spark hash the build used (one
    driver-side 1-row job — xxhash64 has no Python twin), test each
    file's words."""
    from pyspark.sql import functions as F

    from ..operators.bloom import shingle_hash

    h = spark.range(1).select(
        shingle_hash(F.lit(value).cast("string")).alias("h")
    ).first()["h"]
    h1 = h % m_bits
    h2 = (((h & 0xFFFFFFFFFFFFFFFF) >> 17) | 1) % m_bits
    positions = [(h1 + i * h2) % m_bits for i in range(k)]
    keep = []
    for fname, words in blooms.items():
        if all((words[p // 64] >> (p % 64)) & 1 for p in positions):
            keep.append(fname)
    return sorted(keep)
