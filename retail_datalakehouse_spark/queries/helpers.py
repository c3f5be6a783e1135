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


def isqrt_long(c: Column | str) -> Column:
    """EXACT integer sqrt of a non-negative BIGINT column: floor(sqrt) from
    the IEEE-correctly-rounded double sqrt, then a ±1 integer correction —
    deterministic cross-engine where raw libm powers are not. Shared by
    the temperature-sampling queries; any change must mirror their DuckDB
    oracles' r0/r1/s CTE chain."""
    n = F.col(c) if isinstance(c, str) else c
    r = F.floor(F.sqrt(n.cast("double"))).cast("long")
    r = F.when((r + 1) * (r + 1) <= n, r + 1).otherwise(r)
    return F.when(r * r > n, r - 1).otherwise(r)


_HEXD = "0123456789abcdef"


def md5_bucket256(c: Column | str) -> Column:
    """256-level content bucket: the first two hex digits of md5 — the
    hashing-trick feature bucket / deterministic sampler both engines can
    compute (DuckDB: strpos over the same hex string)."""
    col = F.col(c) if isinstance(c, str) else c
    m = F.md5(col.cast("binary"))
    return (
        (F.instr(F.lit(_HEXD), F.substring(m, 1, 1)) - 1) * 16
        + (F.instr(F.lit(_HEXD), F.substring(m, 2, 1)) - 1)
    ).cast("long")


def hash_weights256(spark: SparkSession):
    """The 256-row hashed-classifier weight table (multiplicative-hash
    weights in [-8, 7]) — broadcast as the model dimension. Must mirror
    the oracles' `(range * 2654435761) % 16 - 8`."""
    return spark.range(0, 256).select(
        F.col("id").alias("b"),
        ((F.col("id") * F.lit(2654435761)) % 16 - 8).cast("long").alias("wt"),
    )
