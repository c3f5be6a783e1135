"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``retail_datalakehouse_spark/``; queries are
registered in ``retail_datalakehouse_spark.queries`` (one entry per
implemented operator from SURVEY.md §2, each with a DuckDB oracle where
SQL-expressible).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from retail_datalakehouse_spark import queries as _q

SMOKE_SF_DIR = "/root/testdata/sf0.001"

# Second entry spine (VERDICT r12 item 8 / r13 item 9): the warehouse
# maintenance chain — CDC batch -> SCD2 dimension apply — selectable via
# env var, default unchanged so the driver smoke is stable round-over-
# round. RDL_ENTRY=pit selects the point-in-time feature spine instead.
_ENTRIES = {
    "flagship": "flagship_region_month_revenue",
    "scd2": "x_cdc_scd2_apply",
    "pit": "x_pit_features",
}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Default: revenue / order count / distinct customers per region per
    month — the gold-mart spine (scan → joins → date_trunc → agg →
    top-k). Set RDL_ENTRY=scd2 for the CDC→SCD2 dimension-maintenance
    spine, RDL_ENTRY=pit for the point-in-time feature spine (both
    oracle-hash-checked registry queries in their own right).
    """
    name = _ENTRIES[os.environ.get("RDL_ENTRY", "flagship")]
    return _q.REGISTRY[name].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for each SQL-expressible query."""
    return _q.oracle_sql()
