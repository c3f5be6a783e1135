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
