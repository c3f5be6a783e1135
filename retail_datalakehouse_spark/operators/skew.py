"""Skew mitigation (SURVEY §4 "100 TB" notes): salting for hot join keys.

First line of defense is AQE's skew-join splitting (enabled in
``session.build_spark``), which re-plans oversized partitions at runtime.
Salting is the explicit fallback for the cases AQE can't fix — e.g. a
broadcast-ineligible medium dimension joined on a power-law key
(hot ``user_id``/``product_id`` in the retail star).

``salted_join``: the skewed (large) side gets a random-but-deterministic
salt in [0, n); the compact side is exploded n× with every salt value.
The join key becomes (key, salt) → each hot key's rows spread over n
shuffle partitions instead of one straggler.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join on ``on``. ``small`` is replicated
    ``n_salts``× (keep it the compact side). Salt is derived from a stable
    hash of the large side's full row via xxhash64 — deterministic across
    retries (no rand(), which breaks task replays)."""
    salt = (F.abs(F.xxhash64(*[F.col(c) for c in large.columns])) % n_salts).alias("__salt")
    l_salted = large.withColumn("__salt", salt)
    s_exploded = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = l_salted.join(s_exploded, [on, "__salt"], how)
    return out.drop("__salt")


def key_skew_profile(df: DataFrame, key: str, top: int = 10) -> DataFrame:
    """Diagnostic: per-key row counts + share of total — what you run
    before deciding between AQE, salting, and broadcast."""
    total = df.count()
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .withColumn("share", (F.col("n_rows") / F.lit(total)).cast("double"))
        .orderBy(F.desc("n_rows"), F.asc(key))
        .limit(top)
    )
