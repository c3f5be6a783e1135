"""Mergeable frequency sketches: Misra-Gries heavy hitters.

The 100 TB shape for "which items exceed n/k of all occurrences": a full
groupBy-count shuffles every distinct key; Misra-Gries keeps at most k-1
counters PER PARTITION (bounded executor memory regardless of cardinality),
the partial summaries are mergeable (weighted MG over the union), and the
guarantee — any item with true frequency > n/k survives the sketch — means
an exact recount of only the surviving candidates (a broadcast semi-join)
returns the exact answer in two linear passes with O(k * partitions)
intermediate state.

Misra & Gries (1982); merge step per Agarwal et al., "Mergeable Summaries"
(PODS'12).
"""

from __future__ import annotations

import itertools
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_reduce(values: Iterator, k: int, weights: Iterator | None = None) -> dict:
    """Weighted Misra-Gries over a stream of (value, weight) pairs."""
    counters: dict = {}
    if weights is None:
        weights = itertools.repeat(1)
    for v, w in zip(values, weights):
        if v in counters:
            counters[v] += w
        elif len(counters) < k - 1:
            counters[v] = w
        else:
            # decrement all by the min of (w, smallest counter) repeatedly;
            # single-step approximation: subtract d = min over counters+w
            d = min(w, min(counters.values()))
            dead = []
            for key in counters:
                counters[key] -= d
                if counters[key] <= 0:
                    dead.append(key)
            for key in dead:
                del counters[key]
            if w - d > 0:
                counters[v] = w - d
    return counters


def mg_heavy_hitters(df: DataFrame, col: str, k: int) -> DataFrame:
    """Exact heavy hitters (count > n/k) via Misra-Gries candidates + exact
    recount. Returns (``col``, n) with n the EXACT count, only for items
    whose count strictly exceeds n_total/k.

    Phase 1: per-partition MG summaries (mapInPandas, <= k-1 counters each).
    Phase 2: merge summaries with weighted MG (single tiny group).
    Phase 3: exact recount restricted to the candidate set (broadcast
    semi-join), filter by the true threshold.
    """

    def partial(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in it:
            c = _mg_reduce(iter(pdf[col]), k)
            # fold this batch's counters into the partition's (weighted)
            counters = _mg_reduce(
                iter(list(counters) + list(c)),
                k,
                iter(list(counters.values()) + list(c.values())),
            )
        yield pd.DataFrame(
            {"item": list(counters), "wt": [int(w) for w in counters.values()]}
        )

    src = df.select(F.col(col).cast("string").alias(col))
    schema = "item string, wt long"
    partials = src.mapInPandas(partial, schema=schema)

    # all params annotated: a PARTIALLY hinted grouped-map fn makes
    # pyspark warn "Cannot infer the eval type from type hints" and fall
    # back to positional inference — annotate fully so inference is clean
    def merge(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        counters = _mg_reduce(iter(pdf["item"]), k, iter(pdf["wt"]))
        return pd.DataFrame({"item": list(counters)})

    candidates = (
        partials.withColumn("g", F.lit(1))
        .groupBy("g")
        .applyInPandas(merge, schema="item string")
        .select("item")
    )

    # total folded in as a broadcast scalar so the whole phase-3 recount +
    # threshold filter is ONE job (no separate count() action)
    tot = src.agg(F.count(F.lit(1)).alias("n_total"))
    exact = (
        src.join(
            F.broadcast(candidates), src[col] == candidates.item, "left_semi"
        )
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        exact.crossJoin(F.broadcast(tot))
        .filter(F.col("n") > F.col("n_total") / k)
        .select(col, "n")
    )
