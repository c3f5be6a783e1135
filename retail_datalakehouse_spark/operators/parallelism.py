"""Parallelism repair for CPU-bound per-row operators.

Spark sizes scan parallelism by INPUT BYTES (`spark.sql.files.maxPartitionBytes`),
which is the right call for I/O-bound relational work but wrong for
compute-bound text/vector kernels: a few MB of documents is one split, so
shingling / hashing / scoring an entire corpus can land on ONE core while
31 sit idle. The same shape appears on a real cluster — a modest input
fanned out to a heavy map (minhash over every shingle, per-token scoring)
wants parallelism ≥ total cores regardless of byte count.

`fan_out` round-robins the rows across at least `defaultParallelism`
partitions ONLY when the plan is currently narrower than that — on a
100 TB scan with thousands of splits it is a no-op (no shuffle inserted),
so operators can call it unconditionally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Ensure `df` has at least `min_partitions` (default: the session's
    `sparkContext.defaultParallelism`) partitions before heavy per-row
    compute. No-op when already parallel enough."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
