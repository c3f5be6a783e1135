"""Embedding similarity search (SURVEY §2.10 L3) + embedding near-dedup.

Two tiers:

- **Brute-force top-k cosine** — exact baseline. Dot product and norms via
  `zip_with` + `aggregate` folds over `array<float>` cast to double
  (JVM-side, deterministic left-to-right reduction, no UDF); top-k via
  `orderBy().limit(k)` = `TakeOrderedAndProject` (per-partition heap, no
  global sort). Linear scan — correct at any scale, bandwidth-bound.

- **IVF (inverted-file) top-k** — the scale path: assign every vector to
  its nearest of C centroids (one broadcast-joined cross score against C
  rows, C ≪ N), then search only the query's nprobe closest clusters.
  Centroids here are seeded deterministically from the corpus (ids 0..C-1)
  rather than k-means-trained — the *partition-pruning* structure is what
  matters for the engine: at 100 TB the cluster assignment is a cheap
  narrow column, the search scans nprobe/C of the data, and clusters map
  to partition keys so a probe reads only matching partitions.

- **LSH near-dup** — random-hyperplane sign bits → bucket; exact cosine
  verified only within buckets (mirrors minhash banding for text).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dvec(col) -> F.Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(_dvec(a), _dvec(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a) -> F.Column:
    return F.sqrt(
        F.aggregate(_dvec(a), F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine(a, b) -> F.Column:
    return dot(a, b) / (norm(a) * norm(b))


def _round_half_up(x: float, nd: int) -> float:
    import math

    m = 10**nd
    return math.copysign(math.floor(abs(x) * m + 0.5), x) / m


def select_probe_ids(centroids, query_vec: list[float], nprobe: int) -> list:
    """Pick the ``nprobe`` centroids closest (cosine) to the query.

    ``centroids`` is either a DataFrame[(centroid_id, centroid_vec)] — one
    metadata-sized collect, as before — or an ALREADY-COLLECTED list
    ([(centroid_id, vec), ...] or bare [vec, ...] with ids = positions).
    The list form costs zero Spark jobs, so repeated probes against a
    cached index reuse the collected centroids instead of re-running a
    C-row job per query (r4 review item). Both paths order identically:
    round(cos, 8) desc, centroid_id asc — the Python fold mirrors the
    JVM's left-to-right double accumulation, so scores are bit-equal."""
    import math

    if isinstance(centroids, DataFrame):
        q = F.lit([float(x) for x in query_vec])
        return [
            r.centroid_id
            for r in centroids.select(
                "centroid_id", F.round(cosine(F.col("centroid_vec"), q), 8).alias("s")
            )
            .orderBy(F.desc("s"), F.asc("centroid_id"))
            .limit(nprobe)
            .collect()
        ]
    rows = [
        c if isinstance(c, tuple) else (i, c) for i, c in enumerate(centroids)
    ]
    qv = [float(x) for x in query_vec]
    dq = 0.0
    for y in qv:
        dq += y * y
    dq = math.sqrt(dq)

    def score(vec) -> float:
        num = 0.0
        dv = 0.0
        for x, y in zip(vec, qv):
            num += float(x) * y
        for x in vec:
            dv += float(x) * float(x)
        return _round_half_up(num / (math.sqrt(dv) * dq), 8)

    ranked = sorted(((-score(v), cid) for cid, v in rows))
    return [cid for _, cid in ranked[:nprobe]]


def topk_cosine(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 8,
) -> DataFrame:
    """Exact brute-force top-k by cosine to a literal query vector.
    Score rounded (default 8 dp) and tie-broken by id for determinism."""
    # r14 opt: one array literal, not dim py4j-built F.lit calls
    q = F.lit([float(x) for x in query_vec])
    scored = df.select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col), q), round_to).alias("cos_sim"),
    )
    return scored.orderBy(F.desc("cos_sim"), F.asc(id_col)).limit(k)


def topk_cosine_join(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    q_id: str = "q_id",
    q_vec: str = "q_vec",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 8,
) -> DataFrame:
    """Similarity JOIN: exact top-k corpus neighbors for EVERY query
    vector (the batch shape of cross-corpus dedup / retrieval eval).

    The query set broadcasts (it is the small side by construction), each
    corpus partition scores its rows against all queries JVM-side, and a
    per-query window keeps k — so the shuffle carries only ``n_queries·k``
    survivors per partition after WindowGroupLimit pushdown, never the
    full ``n_queries × corpus`` score matrix. For query sets too large to
    broadcast, route the corpus through :func:`build_ivf_index` and join
    per-cluster instead.

    Returns (q_id, vec_id, cos_sim) with deterministic tie-breaks."""
    scored = corpus.crossJoin(F.broadcast(queries)).select(
        F.col(q_id),
        F.col(id_col),
        F.round(cosine(F.col(vec_col), F.col(q_vec)), round_to).alias("cos_sim"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy(q_id).orderBy(F.desc("cos_sim"), F.asc(id_col))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select(q_id, id_col, "cos_sim")
    )


def radius_search_join(
    queries: DataFrame,
    corpus: DataFrame,
    threshold: float,
    q_id: str = "q_id",
    q_vec: str = "q_vec",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 8,
) -> DataFrame:
    """Radius (range) search: ALL corpus neighbors with cosine ≥
    ``threshold`` for every query — the fixed-similarity companion to
    top-k (dedup sweeps and recall evaluation want "everything this
    close", not "the closest k"). Same broadcast-queries shape as
    :func:`topk_cosine_join`, but the filter replaces the window: each
    corpus partition emits only its ≥-threshold rows, so the shuffle-free
    scan output is the result itself. Self-pairs (same id) are excluded.

    Returns (q_id, vec_id, cos_sim ≥ threshold)."""
    return (
        corpus.crossJoin(F.broadcast(queries))
        .filter(F.col(id_col) != F.col(q_id))
        .select(
            F.col(q_id),
            F.col(id_col),
            F.round(cosine(F.col(vec_col), F.col(q_vec)), round_to).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def ivf_assign(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id: str = "centroid_id",
    centroid_vec: str = "centroid_vec",
) -> DataFrame:
    """Assign each vector to its nearest centroid (max cosine; centroid id
    tie-break). One broadcast join against C centroids — never N×N."""
    joined = df.crossJoin(F.broadcast(centroids)).select(
        F.col(id_col),
        F.col(vec_col),
        F.col(centroid_id),
        F.round(cosine(F.col(vec_col), F.col(centroid_vec)), 8).alias("c_sim"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(F.desc("c_sim"), F.asc(centroid_id))
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(id_col, vec_col, centroid_id)
    )


def ivf_topk(
    df: DataFrame,
    centroids: DataFrame,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF search: score centroids against the query, keep nprobe clusters,
    brute-force only inside them. Approximate (recall < 1 when true
    neighbors live outside probed clusters) — the standard IVF tradeoff."""
    probe_ids = select_probe_ids(centroids, query_vec, nprobe)
    assigned = ivf_assign(df, centroids, id_col=id_col, vec_col=vec_col)
    probed = assigned.filter(F.col("centroid_id").isin(probe_ids))
    return topk_cosine(probed, query_vec, k=k, id_col=id_col, vec_col=vec_col)


def build_ivf_index(
    df: DataFrame,
    centroids: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize the IVF index ONCE: every vector assigned to its nearest
    centroid, written partitioned by ``centroid_id``.

    At 100 TB the assignment is a write-once narrow column, not per-query
    work: queries prune to the probed clusters' partitions at the parquet
    scan (PartitionFilters), so a probe reads nprobe/C of the corpus from
    disk — the difference between an index and a recomputation."""
    assigned = ivf_assign(df, centroids, id_col=id_col, vec_col=vec_col)
    assigned.write.mode("overwrite").partitionBy("centroid_id").parquet(path)


def append_to_ivf_index(
    df: DataFrame,
    centroids: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    txn: tuple[str, int] | None = None,
) -> bool:
    """Incremental IVF maintenance: assign ONLY the new vectors to their
    nearest (unchanged) centroids and APPEND them into the persisted
    index's partition layout — no rebuild, no touch of existing rows.

    This is how a 100 TB vector index absorbs a new crawl batch: the
    append costs O(|batch|) assignment + a partition-aligned write, while
    a rebuild costs O(corpus). Because the centroids are fixed, an
    appended index is IDENTICAL (same rows per partition) to a full
    rebuild over the union — pinned by
    tests/test_llm_ops.py::test_ivf_append_equals_rebuild. Re-clustering
    (when drift degrades balance) is a separate offline job, exactly as
    in production IVF systems.

    ``txn=(writer_id, batch_id)`` makes the append IDEMPOTENT per writer
    (the VersionedTable discipline): a replayed or retried ingest batch at
    or below the writer's last committed batch id is a no-op instead of a
    silent double-append of its vectors. Returns True if the batch was
    written, False if it was a replay. Without ``txn`` the caller must
    guarantee single delivery."""
    import hashlib
    import json
    import os

    if txn is not None:
        writer_id, batch_id = txn
        # ONE marker file per writer (`_txn_state/<writer>.json`, the
        # `_` prefix hides the dir from the index scan): concurrent
        # writers never read-modify-write each other's watermark. The
        # previous single shared `_txn_state.json` was last-writer-wins —
        # a racing pair could clobber the other's marker and re-enable
        # exactly the double-append this guard exists to prevent.
        safe = hashlib.sha256(writer_id.encode()).hexdigest()[:16]
        marker = os.path.join(path, "_txn_state", f"{safe}.json")
        last = None
        if os.path.exists(marker):
            with open(marker) as f:
                last = json.load(f).get("batch_id")
        if last is not None and int(last) >= batch_id:
            return False
    assigned = ivf_assign(df, centroids, id_col=id_col, vec_col=vec_col)
    assigned.write.mode("append").partitionBy("centroid_id").parquet(path)
    if txn is not None:
        # Record AFTER the data write (same ordering as VersionedTable
        # commits): a crash between write and marker re-appends on retry,
        # which exactly-once callers handle by routing through
        # VersionedTable; the marker guards the common replay case.
        os.makedirs(os.path.dirname(marker), exist_ok=True)
        tmp = marker + f".{os.getpid()}.tmp"
        with open(tmp, "w") as f:
            json.dump({"writer_id": writer_id, "batch_id": batch_id}, f)
        os.replace(tmp, marker)
    return True


def ivf_topk_indexed(
    spark,
    index_path: str,
    centroids: DataFrame,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF search against a persisted index: score the C centroids, read
    ONLY the nprobe winning clusters' partitions (partition-pruned scan),
    brute-force inside them. Pass ``centroids`` as the already-collected
    list (see :func:`select_probe_ids`) to make probe selection a pure
    driver computation — zero Spark jobs before the pruned scan."""
    probe_ids = select_probe_ids(centroids, query_vec, nprobe)
    idx = read_ivf_index(spark, index_path, id_col=id_col)
    probed = idx.filter(F.col("centroid_id").isin(probe_ids))
    return topk_cosine(probed, query_vec, k=k, id_col=id_col, vec_col=vec_col)


def delete_from_ivf_index(ids_df: DataFrame, path: str, id_col: str = "vec_id") -> None:
    """Vector UNLEARNING, merge-on-read: append the ids to a tombstone
    table under ``_tombstones/`` (Spark hides ``_``-prefixed dirs from the
    main scan) — an O(deleted) commit that never rewrites the index's
    data files. Readers (:func:`read_ivf_index`, and every probe through
    :func:`ivf_topk_indexed`) anti-join the tombstones, so a deleted
    vector can never be returned by any subsequent search. The GDPR path
    for a 100 TB vector store: erase-by-id costs O(|erased|), not a
    corpus rebuild; a later compaction (rewrite partitions reading
    through the tombstones) reclaims the bytes offline."""
    import os

    ids_df.select(id_col).write.mode("append").parquet(
        os.path.join(path, "_tombstones")
    )


def read_ivf_index(spark, path: str, id_col: str = "vec_id") -> DataFrame:
    """Resolve the live rows of a persisted IVF index: the partitioned
    data anti-joined against any accumulated tombstones. Centroid filters
    still prune partitions — Catalyst pushes the probe's partition
    predicate through the left side of the anti-join."""
    import os

    _heal_interrupted_compaction(path)
    df = spark.read.parquet(path)
    ts_dir = os.path.join(path, "_tombstones")
    if os.path.isdir(ts_dir) and any(
        f.endswith(".parquet") for f in os.listdir(ts_dir)
    ):
        ts = spark.read.parquet(ts_dir)
        df = df.join(F.broadcast(ts), id_col, "left_anti")
    return df


def seeded_centroids(
    df: DataFrame, c: int = 8, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Deterministic pseudo-centroids: the first c vectors by id. (A k-means
    refinement would slot in here; the engine-side structure is unchanged.)"""
    return df.filter(F.col(id_col) < c).select(
        F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("centroid_vec")
    )


def lsh_near_dup_pairs(
    df: DataFrame,
    n_planes: int = 24,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    seed: int = 42,
    n_bands: int = 3,
) -> DataFrame:
    """Embedding near-dup: random-hyperplane LSH signature (n sign bits),
    split into ``n_bands`` bands (mirroring MinHash banding) — a pair is a
    candidate if ANY band's bits match exactly; exact cosine ≥ threshold is
    verified within candidates only.

    Banding is the recall lever: with r = n_planes / n_bands bits per band
    and per-bit agreement p = 1 − θ/π, a true near-dup (θ small) misses
    with probability (1 − p^r)^n_bands — e.g. ≈1e-4 at cos 0.995 with
    3×8 bands — while random pairs (p ≈ 0.5) collide on a band with
    probability ~2^−r each, keeping the verify stage ~1% of all pairs.
    A single concatenated bucket (n_bands=1) forfeits that recall."""
    import random

    if n_planes % n_bands != 0:
        raise ValueError(f"n_planes={n_planes} not divisible by n_bands={n_bands}")
    r = n_planes // n_bands
    rng = random.Random(seed)
    planes = [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]
    bits = [
        F.when(dot(F.col(vec_col), F.lit([float(p) for p in plane])) >= 0, "1").otherwise("0")
        for plane in planes
    ]
    bands = F.array(
        *[
            F.struct(
                F.lit(i).alias("band_idx"),
                F.concat_ws("", *bits[i * r : (i + 1) * r]).alias("band_val"),
            )
            for i in range(n_bands)
        ]
    )
    vecs = df.select(F.col(id_col), F.col(vec_col))
    banded = df.select(F.col(id_col), F.explode(bands).alias("b")).select(
        id_col, "b.band_idx", "b.band_val"
    )
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )
    va = vecs.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"))
    vb = vecs.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("__va"), F.col("__vb")), 8).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def mmr_select(
    rel: dict, sims: dict, k: int = 5, lam_num: int = 7, lam_den: int = 10
) -> list:
    """Greedy Maximal Marginal Relevance selection over a BOUNDED candidate
    pool (Carbonell & Goldstein 1998): pick argmax of
    ``lam*rel(v) - (1-lam)*max_{s in S} sim(v, s)`` k times, first pick by
    pure relevance. All-integer scoring — ``rel``/``sims`` carry fixed-point
    ints and lambda is the rational lam_num/lam_den, so the argmax chain is
    exact and reproducible (ties break on the candidate id). Driver-side by
    design: the pool is the OUTPUT of a distributed top-k (tens of rows);
    the corpus never reaches this function."""
    a, b = lam_num, lam_den - lam_num
    selected: list = []
    for _ in range(min(k, len(rel))):
        if not selected:
            best = min(rel, key=lambda v: (-rel[v], v))
        else:
            best = min(
                (v for v in rel if v not in selected),
                key=lambda v: (
                    -(a * rel[v] - b * max(sims[(v, s)] for s in selected)),
                    v,
                ),
            )
        selected.append(best)
    return selected


def ivf_balance(spark, path: str) -> DataFrame:
    """Cluster-balance report for a persisted IVF index: per-centroid row
    counts plus the imbalance ratio (max/mean, 100 = perfectly balanced,
    in integer percent). This is the drift monitor that decides WHEN to
    re-cluster: appends assign against frozen centroids, so a shifting
    ingest distribution piles rows into few clusters and probe cost
    degrades toward a full scan. Metadata-sized output (C rows), one
    count aggregate over the index."""
    idx = read_ivf_index(spark, path)
    per = idx.groupBy("centroid_id").agg(F.count(F.lit(1)).alias("n"))
    tot = per.agg(
        F.max("n").alias("mx"), F.avg("n").alias("avg"), F.count(F.lit(1)).alias("c")
    )
    return per.crossJoin(F.broadcast(tot)).select(
        "centroid_id",
        "n",
        F.expr("CAST((100 * mx) / avg AS BIGINT)").alias("imbalance_pct"),
    )


def recluster_ivf_index(
    spark,
    path: str,
    out_path: str,
    c: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """OFFLINE re-clustering — the maintenance job `append_to_ivf_index`'s
    frozen-centroid contract defers to: read the live index once, train
    fresh centroids on the CURRENT vector distribution (distributed
    Lloyd's, operators/kmeans.py), and rewrite the index partitioned by
    the new assignment at ``out_path`` (build-then-swap, so readers keep
    the old index until the new one is complete — the same
    staging-directory discipline as VersionedTable commits). Returns the
    new centroids (C rows, broadcastable). Cost is one corpus scan +
    max_iters k·dim-sized aggregations — O(corpus), which is exactly why
    it is a scheduled job and not part of the ingest path."""
    from .kmeans import centroids_df, kmeans_fit

    live = read_ivf_index(spark, path, id_col=id_col).select(id_col, vec_col)
    cents = kmeans_fit(live, k=c, vec_col=vec_col, id_col=id_col)
    cdf = centroids_df(spark, cents)
    build_ivf_index(live, cdf, out_path, id_col=id_col, vec_col=vec_col)
    return cdf


def _heal_interrupted_compaction(path: str) -> None:
    """Make a crashed compaction harmless: a partition dir renamed to
    ``*.old`` whose replacement never landed is renamed back; leftover
    ``*.old`` next to a landed replacement, and orphaned ``*.compact-*``
    staging dirs, are removed. Idempotent; called by both the reader and
    the next compaction run."""
    import os
    import shutil

    for d in os.listdir(path):
        full = os.path.join(path, d)
        if d.endswith(".old"):
            main = full[: -len(".old")]
            if os.path.isdir(main):
                shutil.rmtree(full, ignore_errors=True)  # swap completed
            else:
                os.rename(full, main)  # swap died mid-way: roll back
        elif ".compact-" in d:
            shutil.rmtree(full, ignore_errors=True)  # orphaned staging


def compact_ivf_index(spark, path: str, id_col: str = "vec_id") -> dict:
    """OFFLINE tombstone-reclaiming compaction — the maintenance job
    `delete_from_ivf_index`'s merge-on-read contract defers to: rewrite
    ONLY the partitions that actually contain tombstoned rows (found with
    one broadcast semi-join — untouched clusters keep their files), then
    drop the tombstone table. Search results are identical before and
    after (pinned by test); only bytes and the per-probe anti-join cost
    are reclaimed.

    Crash-safety without multi-dir atomic rename: tombstones are removed
    LAST, so a compaction that dies mid-run leaves every partition either
    rewritten (live rows only) or original (dead rows still masked by the
    still-present tombstones) — reads stay correct at every crash point.
    The one non-atomic window (between the two renames of a partition
    swap) is healed by `_heal_interrupted_compaction`, which the reader
    also runs. Run it like VACUUM: one maintenance writer at a time.

    Returns {"partitions_rewritten", "rows_removed"}."""
    import os
    import shutil
    import uuid

    _heal_interrupted_compaction(path)
    ts_dir = os.path.join(path, "_tombstones")
    if not (
        os.path.isdir(ts_dir)
        and any(f.endswith(".parquet") for f in os.listdir(ts_dir))
    ):
        return {"partitions_rewritten": 0, "rows_removed": 0}
    ts = spark.read.parquet(ts_dir).select(id_col).distinct()
    df = spark.read.parquet(path)
    dead = df.join(F.broadcast(ts), id_col, "semi")
    affected = dead.groupBy("centroid_id").count().collect()
    rows_removed = int(sum(r["count"] for r in affected))

    for r in affected:
        cid = r["centroid_id"]
        part_dir = os.path.join(path, f"centroid_id={cid}")
        staging = os.path.join(path, f"centroid_id={cid}.compact-{uuid.uuid4().hex[:8]}")
        live = spark.read.parquet(part_dir).join(F.broadcast(ts), id_col, "left_anti")
        live.write.mode("overwrite").parquet(staging)
        old = part_dir + ".old"
        os.rename(part_dir, old)
        os.rename(staging, part_dir)
        shutil.rmtree(old, ignore_errors=True)
    shutil.rmtree(ts_dir, ignore_errors=True)  # LAST: masks stay on until done
    return {"partitions_rewritten": len(affected), "rows_removed": rows_removed}
