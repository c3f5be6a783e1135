"""Join operators beyond stock ``DataFrame.join`` (SURVEY §2.3).

Stock joins (inner/outer/semi/anti/cross/theta) are expressed directly with
the DataFrame API and optimized by Catalyst — see ``queries/relational.py``.
This module adds the one join Spark lacks as a primitive: the **as-of join**
(J9), generalizing the reference's correction-file versioning
(``/root/reference/datasets/orders_2024-06-06-Updated.csv`` — "which version
of the row was current at time t") to event-to-state joins.

Scale design: the union+window formulation shuffles each side ONCE on the
join key (same cost as any shuffle join), needs no range-explosion, and is
skew-tolerant under AQE. This beats the naive `left.join(right, key).filter
(r_ts <= l_ts)` + argmax plan, which materializes |left|×|matching right|
intermediate rows before reducing.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str] | None = None,
    strict: bool = False,
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right_ts <= left_ts`` (``<`` if ``strict``) for the same key.

    Implementation: tag both sides, union on (key, ts), then a single
    ``last(value, ignorenulls=True)`` running window per key carries the most
    recent right-side values forward onto left rows. At equal timestamps the
    right row sorts first (non-strict) or last (strict) via the tag column,
    making tie behavior explicit and deterministic.

    Right columns come back suffixed with ``_asof`` (clash-free), plus the
    matched right timestamp as ``<right_ts>_asof``.
    """
    on = list(on)
    right_cols = list(right_cols or [c for c in right.columns if c not in on and c != right_ts])

    # 0 = right rows, 1 = left rows → at equal ts, right sorts first unless strict.
    right_tag, left_tag = (0, 1) if not strict else (1, 0)

    carry = [f"{c}_asof" for c in right_cols] + [f"{right_ts}_asof"]
    r = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias("__ts"),
        F.lit(right_tag).alias("__tag"),
        *[F.col(c).alias(f"{c}_asof") for c in right_cols],
        F.col(right_ts).alias(f"{right_ts}_asof"),
    )
    l = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_ts).alias("__ts"),
        F.lit(left_tag).alias("__tag"),
        *[F.lit(None).cast(r.schema[c].dataType).alias(c) for c in carry],
    )
    unioned = l.unionByName(r, allowMissingColumns=True)

    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").asc(), F.col("__tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned
    for c in carry:
        filled = filled.withColumn(c, F.last(F.col(c), ignorenulls=True).over(w))
    # keep only left rows, drop scaffolding
    return filled.filter(F.col("__tag") == left_tag).drop("__ts", "__tag")


def asof_nearest(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_id: str,
    right_cols: Sequence[str] | None = None,
    tolerance: int | None = None,
) -> DataFrame:
    """As-of join, NEAREST direction (pandas ``merge_asof(direction=
    'nearest')``): for each left row, attach the right row minimizing
    ``|right_ts - left_ts|`` within the same key — ties broken
    deterministically: backward (earlier-or-equal) beats forward, then
    max ``right_id`` backward / min ``right_id`` forward. ``tolerance``
    (same units as the ts columns, which must be NUMERIC — convert
    timestamps with unix_micros upstream) nulls out matches farther than
    the bound, pandas-style.

    Implementation: the backward half is the classic tag-union + running
    ``last(ignorenulls)`` carry (one window); the forward half is the
    SAME union traversed in reverse order (second window over the same
    partitioning — Catalyst reuses one exchange, adds one sort). No
    range-join blowup: cost is two windows over |L|+|R|, the shape that
    survives 100 TB because work per key is linear, never candidate-
    quadratic."""
    on = list(on)
    right_cols = list(
        right_cols
        or [c for c in right.columns if c not in on and c not in (right_ts, right_id)]
    )
    carry = [right_id, right_ts, *right_cols]
    r = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__tag"),
        F.col(right_id).alias("__ord"),
        *[F.col(c).alias(f"__r_{c}") for c in carry],
    )
    l = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__tag"),
        F.lit(None).cast(r.schema["__ord"].dataType).alias("__ord"),
        *[
            F.lit(None).cast(r.schema[f"__r_{c}"].dataType).alias(f"__r_{c}")
            for c in carry
        ],
    )
    u = l.unionByName(r, allowMissingColumns=True)
    wb = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").asc(), F.col("__tag").asc(), F.col("__ord").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").desc(), F.col("__tag").asc(), F.col("__ord").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for c in carry:
        u = u.withColumn(f"__b_{c}", F.last(f"__r_{c}", ignorenulls=True).over(wb))
        u = u.withColumn(f"__f_{c}", F.last(f"__r_{c}", ignorenulls=True).over(wf))
    u = u.filter(F.col("__tag") == 1)
    db = F.col("__ts") - F.col(f"__b_{right_ts}")
    df_ = F.col(f"__f_{right_ts}") - F.col("__ts")
    if tolerance is not None:
        db = F.when(db <= tolerance, db)
        df_ = F.when(df_ <= tolerance, df_)
    use_b = F.col(f"__b_{right_ts}").isNotNull() & db.isNotNull() & (
        F.col(f"__f_{right_ts}").isNull() | df_.isNull() | (db <= df_)
    )
    use_f = ~use_b & F.col(f"__f_{right_ts}").isNotNull() & df_.isNotNull()
    out = u.select(
        *[F.col(c) for c in left.columns],
        F.when(use_b, db).when(use_f, df_).alias("asof_dist"),
        *[
            F.when(use_b, F.col(f"__b_{c}"))
            .when(use_f, F.col(f"__f_{c}"))
            .alias(f"{c}_asof")
            for c in carry
        ],
    )
    return out
