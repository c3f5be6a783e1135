"""Connected components for near-dup cluster resolution (SURVEY §2.10 L2).

LSH/Jaccard emit PAIRS; deduplication needs CLUSTERS (keep one canonical
doc per component of the similarity graph). This is min-label propagation
as iterative DataFrame joins:

    label(v) ← min(label(v), min over neighbors u of label(u))

repeated until no label changes — each iteration is one shuffle (join +
groupBy min), converging in O(graph diameter) rounds, and near-dup graphs
are shallow (dup clusters are cliques-ish, diameter ≤ ~3). Lineage is cut
per iteration with ``localCheckpoint`` so the plan doesn't grow
exponentially. At extreme scale the alternating small-star/large-star
algorithm (Kiveris et al., "Connected Components in MapReduce") halves
round count; the per-round join shape below is the same.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src: str = "src",
    dst: str = "dst",
    max_iters: int = 30,
) -> DataFrame:
    """Label each node with its component id (= the component's minimum
    node id). ``nodes``: one column ``id_col``; ``edges``: undirected
    pairs in (src, dst). Isolated nodes form singleton components.

    Returns (``id_col``, component).
    """
    sym = edges.select(F.col(src).alias("n"), F.col(dst).alias("m")).unionByName(
        edges.select(F.col(dst).alias("n"), F.col(src).alias("m"))
    )
    # materialize the edge list ONCE — it is re-joined every iteration, and
    # an expensive upstream (LSH, Jaccard verify) must not re-run per round
    sym = sym.localCheckpoint(eager=True)
    labels = nodes.select(F.col(id_col).alias("n"), F.col(id_col).alias("lbl"))
    labels = labels.localCheckpoint(eager=True)
    for _ in range(max_iters):
        # min neighbor label per node, one shuffle
        msgs = (
            sym.join(labels.withColumnRenamed("n", "m"), "m")
            .groupBy("n")
            .agg(F.min("lbl").alias("nbr_min"))
        )
        stepped = labels.join(msgs, "n", "left").select(
            "n",
            F.least(F.col("lbl"), F.coalesce("nbr_min", F.col("lbl"))).alias("lbl"),
            (F.coalesce("nbr_min", F.col("lbl")) < F.col("lbl")).alias("chg"),
        )
        stepped = stepped.localCheckpoint(eager=True)  # one job materializes step+flag
        labels = stepped.drop("chg")
        if stepped.filter("chg").limit(1).count() == 0:  # cheap scan, no joins
            break
    return labels.select(F.col("n").alias(id_col), F.col("lbl").alias("component"))
