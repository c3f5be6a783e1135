"""Z-order (Morton) clustering — multi-dimensional data layout
(SURVEY §4: "Z-order-style secondary clustering if Delta present" — Delta
isn't, so the engine implements it directly).

Date partitioning prunes one dimension; queries that ALSO filter on a
second key (customer, product) still scan every file in the partition.
Z-ordering sorts data along an interleaved-bit curve over several columns,
so each parquet file covers a small rectangle in the key space — parquet
min/max row-group stats then let the reader skip most files for ANY of the
z-ordered dimensions, not just the partition column.

Implementation: min-max scale each column to a 16-bit integer (closed-form
column math), interleave bits (Python loop building shift/or expressions —
still one JVM codegen expression), `repartitionByRange` on the z-value
(range exchange → contiguous curve segments per output file), sort within
partitions. Everything stays in WholeStageCodegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_BITS = 16


def _scaled(col: str, mn: float, mx: float) -> F.Column:
    """Min-max scale to [0, 2^N_BITS)."""
    span = (mx - mn) or 1.0
    frac = (F.col(col).cast("double") - F.lit(float(mn))) / F.lit(float(span))
    return F.least(
        F.greatest((frac * ((1 << N_BITS) - 1)).cast("long"), F.lit(0)),
        F.lit((1 << N_BITS) - 1),
    )


def z_value(scaled_cols: list[F.Column]) -> F.Column:
    """Interleave the bits of k scaled columns into one Morton code."""
    k = len(scaled_cols)
    z = F.lit(0).cast("long")
    for bit in range(N_BITS):
        for j, c in enumerate(scaled_cols):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(c, bit).bitwiseAND(F.lit(1)), bit * k + j)
            )
    return z


def z_order_by(df: DataFrame, cols: list[str], n_partitions: int = 8) -> DataFrame:
    """Cluster ``df`` along the Z-curve of ``cols``: each output partition
    (→ parquet file on write) covers a compact rectangle in key space.
    Column ranges are taken from one cheap min/max aggregate."""
    bounds = df.agg(
        *[F.min(c).cast("double").alias(f"mn_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"mx_{c}") for c in cols],
    ).collect()[0]
    scaled = [_scaled(c, bounds[f"mn_{c}"], bounds[f"mx_{c}"]) for c in cols]
    with_z = df.withColumn("__z", z_value(scaled))
    return (
        with_z.repartitionByRange(n_partitions, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
