"""Mergeable quantile sketch (t-digest, k1 scale function) — the
distributed-percentile primitive a 100 TB profiling pass needs.

Exact percentiles need a global sort (or the distributed rank in
``operators/ranking.py``); Spark's built-in ``approx_percentile`` is a
GK summary that lives and dies inside one aggregation. What a large
pipeline wants is the DataSketches shape: a per-shard SKETCH you can
PERSIST as a tiny table, MERGE across days/partitions without touching
raw data, and query for any quantile later — same operational pattern
as the persisted LSH band index in ``operators/minhash.py``.

Design (Dunning's t-digest, our deterministic vectorized variant):

- **Shard** rows by ``pmod(xxhash64(value), P)`` — a pure content hash,
  so the sharding (and therefore every centroid) is independent of
  partition layout, scheduling, and AQE; two runs over the same data
  produce BIT-IDENTICAL digests (engine-RNG-free, the same discipline
  as x_sample_deterministic).
- **Compress** each shard's sorted values into centroids by the k1
  scale function k(q) = δ/2π·asin(2q−1): a centroid may span [q0,q1]
  only while k(q1)−k(q0) ≤ 1, which caps centroid count at ~δ/2 + 2
  (k's range is ±δ/4) and
  concentrates resolution at the tails (the quantiles people actually
  ask for). Vectorized: cluster id = floor(k(q_mid)) per value, one
  pandas groupby — no per-value Python loop.
- **Merge** = concatenate centroid lists, sort by mean, re-compress.
  Associative up to the documented t-digest re-compression error; the
  final merge runs over at most P·(δ/2+2) centroid rows — bounded by
  CONFIG,
  not data, so the single-group applyInPandas stage is O(1) state.
- **Query** interpolates between centroid centers (cumulative weight −
  w/2), clamped to the exactly-tracked global min/max.

Rank-error contract (pinned by tests/test_tdigest.py): ≤ 1.5 % of N at
the quartiles, ≤ 0.5 % at the 1 %/99 % tails, for δ = 100.

Reference parity: the reference repo (431 LoC of AWS provisioning —
see SURVEY §0) has no sketch engine; this fills the quantile slot of
the sketch family next to bloom.py / sketches.py (Misra-Gries) /
minhash.py.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DIGEST_SCHEMA = (
    "shard long, means array<double>, weights array<double>, "
    "n long, lo double, hi double"
)


def _compress(means: np.ndarray, weights: np.ndarray, delta: int):
    """One t-digest compression pass over (mean, weight) pairs that are
    already sorted by mean. Returns (means, weights) arrays with at most
    ~delta/2 + 2 centroids (k's floor-band count)."""
    total = float(weights.sum())
    cum = np.cumsum(weights)
    # q at each input's center of mass; k1 scale; same-floor => same cluster
    q_mid = (cum - weights / 2.0) / total
    k = np.floor(delta / (2.0 * math.pi) * np.arcsin(2.0 * q_mid - 1.0))
    # boundaries where the cluster id changes
    new = np.empty(len(k), dtype=bool)
    new[0] = True
    np.not_equal(k[1:], k[:-1], out=new[1:])
    gidx = np.cumsum(new) - 1
    n_groups = int(gidx[-1]) + 1
    w_out = np.zeros(n_groups)
    np.add.at(w_out, gidx, weights)
    m_out = np.zeros(n_groups)
    np.add.at(m_out, gidx, means * weights)
    m_out /= w_out
    return m_out, w_out


def build_tdigest(
    df: DataFrame,
    col: str,
    *,
    delta: int = 100,
    num_shards: int = 64,
) -> DataFrame:
    """One digest row per content shard (``num_shards`` rows total).
    Nulls are excluded (quantiles are defined over present values).
    The result is the PERSISTABLE form — write it as a tiny table and
    merge tomorrow's build into it without rescanning today's data."""
    src = df.select(F.col(col).cast("double").alias("v")).where(
        F.col("v").isNotNull()
    )
    sharded = src.withColumn(
        "shard", F.pmod(F.xxhash64(F.col("v")), F.lit(num_shards))
    )

    def one_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(pdf["v"].to_numpy(dtype=np.float64))
        m, w = _compress(v, np.ones_like(v), delta)
        return pd.DataFrame(
            {
                "shard": [int(pdf["shard"].iloc[0])],
                "means": [m.tolist()],
                "weights": [w.tolist()],
                "n": [len(v)],
                "lo": [float(v[0])],
                "hi": [float(v[-1])],
            }
        )

    return sharded.groupBy("shard").applyInPandas(one_shard, DIGEST_SCHEMA)


def merge_tdigest(digests: DataFrame, *, delta: int = 100) -> DataFrame:
    """Merge any number of digest rows (one build, several days, several
    columns' worth re-keyed — anything in DIGEST_SCHEMA) into ONE row.
    The input is centroid rows — at most shards x (delta/2 + 2) of them, a
    config-bounded frame — so the single-group stage holds O(delta)
    state, never data-sized."""

    def merge_all(pdf: pd.DataFrame) -> pd.DataFrame:
        m = np.concatenate([np.asarray(x, dtype=np.float64) for x in pdf["means"]])
        w = np.concatenate([np.asarray(x, dtype=np.float64) for x in pdf["weights"]])
        order = np.argsort(m, kind="stable")
        m, w = _compress(m[order], w[order], delta)
        return pd.DataFrame(
            {
                "shard": [-1],
                "means": [m.tolist()],
                "weights": [w.tolist()],
                "n": [int(pdf["n"].sum())],
                "lo": [float(pdf["lo"].min())],
                "hi": [float(pdf["hi"].max())],
            }
        )

    return (
        digests.withColumn("_g", F.lit(0))
        .groupBy("_g")
        .applyInPandas(lambda _, pdf: merge_all(pdf), DIGEST_SCHEMA)
    )


def quantiles_from_digest(digest: DataFrame, qs: list[float]) -> DataFrame:
    """Estimate quantiles from a (usually merged, single-row) digest.
    Returns one row per q: (q double, estimate double). Interpolation
    between centroid centers, clamped to the exact [lo, hi]."""
    q_arr = list(map(float, qs))

    def est(pdf: pd.DataFrame) -> pd.DataFrame:
        out_q, out_e = [], []
        for _, row in pdf.iterrows():
            m = np.asarray(row["means"], dtype=np.float64)
            w = np.asarray(row["weights"], dtype=np.float64)
            n = float(w.sum())
            centers = np.cumsum(w) - w / 2.0
            for q in q_arr:
                r = q * n
                if r <= centers[0]:
                    e = row["lo"] + (m[0] - row["lo"]) * (
                        r / centers[0] if centers[0] > 0 else 0.0
                    )
                elif r >= centers[-1]:
                    span = n - centers[-1]
                    e = m[-1] + (row["hi"] - m[-1]) * (
                        (r - centers[-1]) / span if span > 0 else 1.0
                    )
                else:
                    i = int(np.searchsorted(centers, r, side="right"))
                    f = (r - centers[i - 1]) / (centers[i] - centers[i - 1])
                    e = m[i - 1] + (m[i] - m[i - 1]) * f
                out_q.append(q)
                out_e.append(float(e))
        return pd.DataFrame({"q": out_q, "estimate": out_e})

    return (
        digest.withColumn("_g", F.lit(0))
        .groupBy("_g")
        .applyInPandas(lambda _, pdf: est(pdf), "q double, estimate double")
    )


def _digest_schema(by_schema: str) -> str:
    return by_schema + ", " + DIGEST_SCHEMA


def build_tdigest_grouped(
    df: DataFrame,
    col: str,
    by: list[str],
    *,
    delta: int = 100,
    num_shards: int = 16,
) -> DataFrame:
    """Per-GROUP digests — the distributed per-segment percentile
    pattern (one sketch per (group, content shard); groups scale out,
    shards parallelize within a group). Same determinism contract as
    the global build: shard = pmod(xxhash64(value), P) is layout-free."""
    by_schema = ", ".join(
        f"{n} {t}" for n, t in df.select(*by).dtypes
    )
    src = df.select(*by, F.col(col).cast("double").alias("v")).where(
        F.col("v").isNotNull()
    )
    sharded = src.withColumn(
        "shard", F.pmod(F.xxhash64(F.col("v")), F.lit(num_shards))
    )

    def one(keys, pdf: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(pdf["v"].to_numpy(dtype=np.float64))
        m, w = _compress(v, np.ones_like(v), delta)
        out = {n: [k] for n, k in zip(by, keys[:-1])}
        out.update(
            {
                "shard": [int(keys[-1])],
                "means": [m.tolist()],
                "weights": [w.tolist()],
                "n": [len(v)],
                "lo": [float(v[0])],
                "hi": [float(v[-1])],
            }
        )
        return pd.DataFrame(out)

    return sharded.groupBy(*by, "shard").applyInPandas(
        one, _digest_schema(by_schema)
    )


def merge_tdigest_grouped(
    digests: DataFrame, by: list[str], *, delta: int = 100
) -> DataFrame:
    """Collapse each group's shard digests to ONE digest row per group
    (still config-bounded per group: shards x (delta/2 + 2) centroids)."""
    by_schema = ", ".join(
        f"{n} {t}" for n, t in digests.select(*by).dtypes
    )

    def merge_group(keys, pdf: pd.DataFrame) -> pd.DataFrame:
        m = np.concatenate([np.asarray(x, dtype=np.float64) for x in pdf["means"]])
        w = np.concatenate([np.asarray(x, dtype=np.float64) for x in pdf["weights"]])
        order = np.argsort(m, kind="stable")
        m, w = _compress(m[order], w[order], delta)
        out = {n: [k] for n, k in zip(by, keys)}
        out.update(
            {
                "shard": [-1],
                "means": [m.tolist()],
                "weights": [w.tolist()],
                "n": [int(pdf["n"].sum())],
                "lo": [float(pdf["lo"].min())],
                "hi": [float(pdf["hi"].max())],
            }
        )
        return pd.DataFrame(out)

    return digests.groupBy(*by).applyInPandas(
        merge_group, _digest_schema(by_schema)
    )


def quantiles_from_digest_grouped(
    digest: DataFrame, qs: list[float], by: list[str]
) -> DataFrame:
    """Per-group quantile estimates: one row per (group, q)."""
    q_arr = list(map(float, qs))
    by_schema = ", ".join(
        f"{n} {t}" for n, t in digest.select(*by).dtypes
    )

    def est_group(keys, pdf: pd.DataFrame) -> pd.DataFrame:
        row = pdf.iloc[0]
        m = np.asarray(row["means"], dtype=np.float64)
        w = np.asarray(row["weights"], dtype=np.float64)
        n = float(w.sum())
        centers = np.cumsum(w) - w / 2.0
        out_q, out_e = [], []
        for q in q_arr:
            r = q * n
            if r <= centers[0]:
                e = row["lo"] + (m[0] - row["lo"]) * (
                    r / centers[0] if centers[0] > 0 else 0.0
                )
            elif r >= centers[-1]:
                span = n - centers[-1]
                e = m[-1] + (row["hi"] - m[-1]) * (
                    (r - centers[-1]) / span if span > 0 else 1.0
                )
            else:
                i = int(np.searchsorted(centers, r, side="right"))
                f = (r - centers[i - 1]) / (centers[i] - centers[i - 1])
                e = m[i - 1] + (m[i] - m[i - 1]) * f
            out_q.append(q)
            out_e.append(float(e))
        out = {n_: [k] * len(out_q) for n_, k in zip(by, keys)}
        out.update({"q": out_q, "estimate": out_e})
        return pd.DataFrame(out)

    return digest.groupBy(*by).applyInPandas(
        est_group, by_schema + ", q double, estimate double"
    )
