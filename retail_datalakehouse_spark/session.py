"""SparkSession construction, tuned for the engine's execution profile.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default 32 threads), but
every setting here is chosen to also hold on a large multi-executor cluster:

- AQE on (runtime re-planning: partition coalescing, skew-join splitting,
  broadcast demotion/promotion) — the primary scale lever at 100 TB.
- Auto-broadcast threshold raised: dimension tables (region/nation/customer/
  part at TPC-H-ish ratios, products in the retail star) stay broadcast-able.
- ``spark.sql.shuffle.partitions`` sized to cores locally; on a real cluster
  AQE coalesces from a deliberately high initial number instead.
- Arrow enabled so pandas-UDF paths (similarity kernels, grouped transforms)
  batch-transfer instead of pickling rows.
- Session timezone pinned to UTC so timestamp extraction (hour/day/window)
  is deterministic and matches the DuckDB oracle exactly.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def build_spark(
    app_name: str = "retail-datalakehouse-spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    Parity note: the reference configures its runtime from env in
    ``cli_config.py:8-31`` (``.env`` → aws configure); our analogue is a
    single tuned builder reading ``SPARK_GRAFT_*`` env vars.
    """
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.master(master or f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.streaming.schemaInference", "true")
        # Driver testdata writes events.ts as parquet TIMESTAMP(NANOS), which
        # Spark's vectorized reader rejects; read as long and convert in the
        # catalog loader (catalog.load_table).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
