"""Distributed k-means (Lloyd's) in pure DataFrame ops — the centroid
trainer for IVF similarity search (SURVEY §2.10 L3 scale path).

Why not MLlib KMeans? It works, but this formulation shows the engine-level
shape AND keeps everything on the narrow path we control:

- **assign**: each point's nearest centroid via a broadcast of the k
  centroid arrays — one `transform`+`array_position` expression per row,
  no shuffle, no UDF.
- **update**: new centroid j = mean of assigned vectors, computed by
  `posexplode`(vector) → groupBy(cluster, dim) avg → re-assembled with
  `array_agg` sorted by dim. Two-phase agg; shuffle volume is
  k·dim doubles per partition — independent of N.
- **iterate**: driver loop over a handful of Lloyd iterations; each
  iteration is one job. Convergence by centroid shift < tol.

Initialization is deterministic (first k distinct vectors by id — k-means++
would slot in here; determinism matters more than quality for oracle/replay
purposes).

At 100 TB: N-row work stays map-side (assignment) and the only aggregation
is k·dim-sized. The collected centroids are k·dim doubles on the driver —
trivially broadcastable back.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _assign_expr(centroids: list[list[float]], vec_col: str) -> F.Column:
    """Column: index (0-based) of the nearest centroid by squared L2."""
    dists = [
        F.aggregate(
            F.zip_with(
                F.col(vec_col),
                # r14 opt: ONE array literal per centroid (a per-element
                # F.lit chain cost k*dim py4j calls per iteration)
                F.lit([float(x) for x in c]),
                lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        for c in centroids
    ]
    arr = F.array(*dists)
    return (F.array_position(arr, F.array_min(arr)) - 1).cast("int")


def kmeans_fit(
    df: DataFrame,
    k: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_iters: int = 5,
    tol: float = 1e-6,
) -> list[list[float]]:
    """Lloyd's algorithm; returns k centroid vectors (list of lists)."""
    # Strided init: k vectors at evenly spaced ids — deterministic AND
    # spread across the data (taking the first k is degenerate when storage
    # order correlates with cluster structure). The modulo filter + top-k
    # keeps this fully distributed (TakeOrderedAndProject); a global
    # row_number window would drag every row through one partition.
    # The stride assumes dense 0-based numeric ids; with sparse or hashed
    # ids the filter may select < k rows, so fall back to the first k by
    # id (still deterministic, still TakeOrderedAndProject) rather than
    # padding with duplicate centroids.
    n = df.count()
    stride = max(n // k, 1)
    init_rows = (
        df.filter(F.col(id_col) % stride == 0)
        .orderBy(id_col)
        .limit(k)
        .select(vec_col)
        .collect()
    )
    if len(init_rows) < k:
        init_rows = df.orderBy(id_col).limit(k).select(vec_col).collect()
    centroids = [[float(x) for x in r[0]] for r in init_rows[:k]]
    while len(centroids) < k:  # fewer than k rows exist at all
        centroids.append(centroids[-1])

    for _ in range(max_iters):
        assigned = df.select(
            _assign_expr(centroids, vec_col).alias("cluster"), F.col(vec_col)
        )
        means = (
            assigned.select("cluster", F.posexplode(vec_col).alias("dim", "x"))
            .groupBy("cluster", "dim")
            .agg(F.avg(F.col("x").cast("double")).alias("m"))
            .groupBy("cluster")
            .agg(F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("dm"))
            .select("cluster", F.transform("dm", lambda s: s.getField("m")).alias("centroid"))
            .collect()
        )
        new_centroids = list(centroids)
        for r in means:
            new_centroids[r.cluster] = [float(x) for x in r.centroid]
        shift = max(
            sum((a - b) ** 2 for a, b in zip(old, new))
            for old, new in zip(centroids, new_centroids)
        )
        centroids = new_centroids
        if shift < tol:
            break
    return centroids


def centroids_df(spark, centroids: list[list[float]]) -> DataFrame:
    """Package trained centroids in the shape `similarity.ivf_topk` expects."""
    return spark.createDataFrame(
        [(i, c) for i, c in enumerate(centroids)], ["centroid_id", "centroid_vec"]
    )
