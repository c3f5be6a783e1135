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

import pandas as pd
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


def hilbert_value(x: F.Column, y: F.Column) -> F.Column:
    """Hilbert curve distance d for a 2-D point of N_BITS-scaled coords —
    the classic xy→d transform (the iterative rot() formulation), run as
    an ARROW-VECTORIZED pandas UDF: 16 numpy passes over the whole batch
    (bitwise ops on int64 arrays), no per-row Python. This is the
    documented escape hatch — the rot() recurrence rebinds x and y at
    every level, so a pure column-expression unrolling multiplies the
    expression tree ~5× per level (4^16 nodes by level 16: Catalyst dies
    building it), while the numpy form is 16 O(batch) vector ops.

    Why beside Z-order: a Morton curve makes long jumps between quadrant
    boundaries, so a file of contiguous z-values can span two far-apart
    rectangles; the Hilbert curve is CONTINUOUS (adjacent d → adjacent
    cells), giving tighter per-file bounding boxes and therefore better
    min/max skipping on the same file count (the reason Databricks
    liquid clustering and Amazon Redshift sort keys moved Morton →
    Hilbert). Write-path-only cost: the curve value is computed once at
    layout time, never in the query hot path."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _hilbert(xs: pd.Series, ys: pd.Series) -> pd.Series:
        import numpy as np

        x = xs.to_numpy(dtype=np.int64, copy=True)
        y = ys.to_numpy(dtype=np.int64, copy=True)
        d = np.zeros_like(x)
        s = np.int64(1 << (N_BITS - 1))
        while s > 0:
            rx = ((x & s) > 0).astype(np.int64)
            ry = ((y & s) > 0).astype(np.int64)
            d += s * s * ((3 * rx) ^ ry)
            # rot(): reflect when ry == 0 (mirror when rx == 1), then swap
            refl = (ry == 0) & (rx == 1)
            x = np.where(refl, s - 1 - x, x)
            y = np.where(refl, s - 1 - y, y)
            swap = ry == 0
            x, y = np.where(swap, y, x), np.where(swap, x, y)
            s >>= 1
        return pd.Series(d)

    return _hilbert(x, y)


def hilbert_order_by(df: DataFrame, cols: list[str], n_partitions: int = 8) -> DataFrame:
    """Cluster ``df`` along the Hilbert curve of two columns (same
    contract as :func:`z_order_by`; 2-D only — the standard rot()
    transform is two-dimensional)."""
    if len(cols) != 2:
        raise ValueError("hilbert_order_by takes exactly two columns")
    bounds = df.agg(
        *[F.min(c).cast("double").alias(f"mn_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"mx_{c}") for c in cols],
    ).collect()[0]
    sx, sy = [_scaled(c, bounds[f"mn_{c}"], bounds[f"mx_{c}"]) for c in cols]
    with_h = df.withColumn("__h", hilbert_value(sx, sy))
    return (
        with_h.repartitionByRange(n_partitions, "__h")
        .sortWithinPartitions("__h")
        .drop("__h")
    )
