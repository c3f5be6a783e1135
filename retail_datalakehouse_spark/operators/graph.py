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


def _union_find_labels(pairs: list[tuple]) -> dict:
    """Driver-local exact connected components over an edge list: classic
    union-find (path halving + union by size), then every member labeled
    with its component's MINIMUM node id — the identical labeling the
    distributed min-label propagation converges to."""
    parent: dict = {}
    size: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            parent[root] = parent[parent[root]]  # path halving
            root = parent[root]
        return root

    for a, b in pairs:
        for v in (a, b):
            if v not in parent:
                parent[v] = v
                size[v] = 1
        ra, rb = find(a), find(b)
        if ra != rb:
            if size[ra] < size[rb]:
                ra, rb = rb, ra
            parent[rb] = ra
            size[ra] += size[rb]
    comp_min: dict = {}
    for v in parent:
        r = find(v)
        if r not in comp_min or v < comp_min[r]:
            comp_min[r] = v
    return {v: comp_min[find(v)] for v in parent}


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src: str = "src",
    dst: str = "dst",
    max_iters: int = 30,
    driver_edge_threshold: int | None = 1_000_000,
) -> DataFrame:
    """Label each node with its component id (= the component's minimum
    node id). ``nodes``: one column ``id_col``; ``edges``: undirected
    pairs in (src, dst). Isolated nodes form singleton components.

    Scale shape: ``nodes`` may be corpus-sized and never leaves the
    cluster. The EDGE set of a near-dup graph is the sliver of the corpus
    with at least one high-similarity pair; when it is bounded
    (``<= driver_edge_threshold`` edges, default 1M ≈ tens of MB) the
    components are solved exactly with driver-side union-find — one
    bounded count + one collect + ONE broadcast join over the nodes, no
    iteration at all. Larger edge sets fall back to distributed min-label
    propagation over only the edge-incident nodes (isolated nodes join
    back as singletons), one shuffle per round for O(diameter) rounds —
    identical labeling, pinned by a path-equivalence test.

    Returns (``id_col``, component).
    """
    all_nodes = nodes.select(F.col(id_col).alias("n"))
    # materialize the edge list ONCE, before any branch — it is re-scanned
    # by the bounded count, the collect-or-loop, and (in the loop) every
    # iteration; an expensive upstream (LSH, Jaccard verify) must not
    # re-run per consumer
    raw_e = edges.select(F.col(src).alias("ea"), F.col(dst).alias("eb")).localCheckpoint(
        eager=True
    )
    if (
        driver_edge_threshold is not None
        and raw_e.limit(driver_edge_threshold + 1).count() <= driver_edge_threshold
    ):
        # Propagation flows only through declared nodes (the loop enforces
        # this inherently via its label joins); mirror it here with
        # semi-joins on the — bounded — edge set before collecting.
        valid = raw_e.join(
            all_nodes.withColumnRenamed("n", "ea"), "ea", "left_semi"
        ).join(all_nodes.withColumnRenamed("n", "eb"), "eb", "left_semi")
        mapping = _union_find_labels([(r["ea"], r["eb"]) for r in valid.collect()])
        if not mapping:
            return all_nodes.select(
                F.col("n").alias(id_col), F.col("n").alias("component")
            )
        map_df = nodes.sparkSession.createDataFrame(
            list(mapping.items()), ["n", "lbl"]
        )
        return all_nodes.join(F.broadcast(map_df), "n", "left").select(
            F.col("n").alias(id_col),
            F.coalesce("lbl", F.col("n")).alias("component"),
        )
    sym = raw_e.select(F.col("ea").alias("n"), F.col("eb").alias("m")).unionByName(
        raw_e.select(F.col("eb").alias("n"), F.col("ea").alias("m"))
    )
    sym = sym.localCheckpoint(eager=True)
    # Only edge-incident nodes participate in propagation; isolated nodes
    # are singleton components by definition and skip the loop entirely. In
    # a near-dup graph over a large corpus almost every doc is isolated, so
    # this shrinks every per-iteration join/agg to the (tiny) incident set.
    endpoints = sym.select("n").distinct()
    labels = all_nodes.join(endpoints, "n").select("n", F.col("n").alias("lbl"))
    labels = labels.localCheckpoint(eager=True)
    converged = False
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
            converged = True
            break
    if not converged:
        # Partially-propagated labels are WRONG components (a long path can
        # need O(diameter) rounds); callers doing dedup would silently keep
        # the wrong survivors. Fail loudly instead.
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} iterations; "
            "graph diameter exceeds max_iters — raise max_iters or switch to "
            "the large-star/small-star variant"
        )
    isolated = all_nodes.join(endpoints, "n", "left_anti").select(
        "n", F.col("n").alias("lbl")
    )
    return labels.unionByName(isolated).select(
        F.col("n").alias(id_col), F.col("lbl").alias("component")
    )


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iters: int = 10,
) -> DataFrame:
    """PageRank over a directed edge list as iterative DataFrame joins —
    the standard power iteration:

        pr(v) <- (1-d)/N + d * sum over in-neighbors u of pr(u)/outdeg(u)

    Each iteration is one shuffle (join ranks to edges on src, groupBy dst).
    Dangling nodes (no out-edges) redistribute their mass uniformly via a
    scalar aggregate (metadata-sized collect), keeping the total mass 1 so
    ranks are comparable across iterations. The out-degree table and edge
    list are checkpointed once and re-joined per round; lineage is cut per
    iteration exactly as in :func:`connected_components`.

    Returns (node, pagerank) for every node appearing as src or dst.
    """
    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_nodes = nodes.count()
    out = edges.groupBy(F.col(src).alias("node")).agg(
        F.count(F.lit(1)).alias("outdeg")
    )
    # (src node, dst, outdeg) — re-joined every round
    e = (
        edges.select(F.col(src).alias("node"), F.col(dst).alias("dst"))
        .join(out, "node")
        .localCheckpoint(eager=True)
    )
    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("pr"))
    for _ in range(iters):
        # one join+shuffle per round, materialized ONCE (checkpoint), then
        # reused by both the dangling-mass scalar and the rank update
        contribs = (
            e.join(ranks, "node")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("pr") / F.col("outdeg")).alias("in_mass"))
            .localCheckpoint(eager=True)
        )
        # total rank is 1 and every non-dangling node's rank was fully
        # distributed, so dangling mass = 1 - sum of distributed mass —
        # a scalar agg over the checkpointed contribs, no anti-join rescan
        distributed = contribs.agg(F.sum("in_mass").alias("m")).collect()[0]["m"] or 0.0
        dangling = max(0.0, 1.0 - distributed)
        base = (1.0 - damping) / n_nodes + damping * dangling / n_nodes
        ranks = nodes.join(contribs, "node", "left").select(
            "node",
            (F.lit(base) + F.lit(damping) * F.coalesce("in_mass", F.lit(0.0))).alias(
                "pr"
            ),
        )
    return ranks.select("node", F.col("pr").alias("pagerank"))
