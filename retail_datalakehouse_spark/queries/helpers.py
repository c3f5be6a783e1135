"""Oracle-parity helpers.

Floating-point summation is order-dependent, and Spark (partial/final
aggregation across partitions) sums in a different order than DuckDB
(sequential/vectorized). To make value hashes match exactly we route every
money/metric SUM through exact decimal arithmetic — cast each addend to a
fixed-scale decimal, sum exactly, cast the final result back to double —
on BOTH engines. Per-element double arithmetic (a*b, 1-x) is IEEE-identical
across engines, so per-row products stay in double and only the reduction is
decimalized.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table

# ---------------------------------------------------------------- Spark side


def dsum(col: Column | str, scale: int = 4, out_round: int = 2) -> Column:
    """Exact SUM: cast addends to decimal(25,scale), sum, round, → double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast(f"decimal(25,{scale})")), out_round).cast("double")


def davg(col: Column | str, scale: int = 6, out_round: int = 4) -> Column:
    """Deterministic AVG: exact decimal sum / count, rounded, as double."""
    c = F.col(col) if isinstance(col, str) else col
    total = F.sum(c.cast(f"decimal(25,{scale})")).cast("double")
    return F.round(total / F.count(c), out_round)


def revenue_expr() -> Column:
    """l_extendedprice * (1 - l_discount), the lakehouse's money metric."""
    return F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ----------------------------------------------------------------- SQL side


def sql_dsum(expr: str, scale: int = 4, out_round: int = 2) -> str:
    return f"CAST(ROUND(SUM(CAST({expr} AS DECIMAL(25,{scale}))), {out_round}) AS DOUBLE)"


def sql_davg(expr: str, scale: int = 6, out_round: int = 4) -> str:
    return (
        f"ROUND(CAST(SUM(CAST({expr} AS DECIMAL(25,{scale}))) AS DOUBLE)"
        f" / COUNT({expr}), {out_round})"
    )


SQL_REVENUE = "l_extendedprice * (1 - l_discount)"
