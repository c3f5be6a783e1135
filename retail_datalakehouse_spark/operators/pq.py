"""Product quantization (PQ) for approximate nearest neighbor search
(SURVEY §2.10 L3 scale path; Jégou et al., "Product Quantization for
Nearest Neighbor Search", IEEE TPAMI 2011).

The vector space is split into ``m`` contiguous subspaces; each subspace
gets its own small k-means codebook (trained with the engine's pure-
DataFrame Lloyd's — `operators/kmeans.py`). A vector is stored as ``m``
small codes (here int, 1 byte each at k<=256) instead of ``dim`` floats:
64-dim float32 → 4 bytes of codes, a 64× compression of the scan set.

Query-time scoring is **asymmetric distance computation (ADC)**: the query
is NOT quantized — for each subspace a lookup table of exact
``||q_sub - centroid_j||²`` distances is computed once on the driver
(m·k doubles), and each stored vector's approximate distance is the sum of
``m`` table lookups on its codes. In Spark that is ``element_at`` on a
broadcast literal array — pure JVM codegen, no UDF, no shuffle; the
candidate pass is a linear scan of the (tiny) code columns followed by a
``TakeOrderedAndProject`` heap top-k, then exact rescoring touches only
the surviving candidates.

At 100 TB: codes are written once next to the vectors (or into the IVF
partition layout — PQ composes with `operators/similarity.ivf_*` as
IVF-PQ); the scan reads m bytes/vector instead of 4·dim, which is the
memory-bandwidth win that makes billion-scale ANN feasible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

def _nearest_code(codebook: list[list[float]], subvec: Column) -> Column:
    """0-based index of the nearest codebook centroid by squared L2."""
    dists = [
        F.aggregate(
            F.zip_with(
                subvec,
                F.array(*[F.lit(float(x)) for x in c]),
                lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        for c in codebook
    ]
    arr = F.array(*dists)
    return (F.array_position(arr, F.array_min(arr)) - 1).cast("int")


def pq_train(
    df: DataFrame,
    m: int = 4,
    k: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_iters: int = 4,
) -> list[list[list[float]]]:
    """Train ``m`` per-subspace codebooks of ``k`` centroids each.

    ``dim`` must be divisible by ``m``. Each subspace fit is an independent
    Lloyd's run over the sliced vectors — at scale these are m narrow
    passes whose shuffle volume is k·(dim/m) doubles, independent of N.
    """
    dim = len(df.select(vec_col).first()[0])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    sliced = df.select(
        F.col(id_col),
        *[F.slice(F.col(vec_col), s * sub + 1, sub).alias(f"sub_{s}") for s in range(m)],
    )

    # Strided deterministic init (same discipline as kmeans_fit), but ONE
    # collect covers all m subspaces — Lloyd's then runs the m independent
    # fits in lockstep so each iteration is a single Spark job (a union of
    # the m per-subspace mean aggregations), not m separate job chains.
    n = df.count()
    stride = max(n // k, 1)
    init_rows = (
        sliced.filter(F.col(id_col) % stride == 0).orderBy(id_col).limit(k).collect()
    )
    if len(init_rows) < k:
        # sparse/hashed ids defeat the stride — first k by id instead of
        # silently padding duplicate codes (degenerate codebooks)
        init_rows = sliced.orderBy(id_col).limit(k).collect()
    codebooks = []
    for s in range(m):
        cb = [[float(x) for x in r[f"sub_{s}"]] for r in init_rows[:k]]
        while len(cb) < k:  # fewer than k rows exist at all
            cb.append(cb[-1])
        codebooks.append(cb)

    for _ in range(max_iters):
        parts = []
        for s in range(m):
            parts.append(
                sliced.select(
                    F.lit(s).alias("s"),
                    _nearest_code(codebooks[s], F.col(f"sub_{s}")).alias("cluster"),
                    F.posexplode(f"sub_{s}").alias("dim", "x"),
                )
            )
        allparts = parts[0]
        for p in parts[1:]:
            allparts = allparts.unionAll(p)
        means = (
            allparts.groupBy("s", "cluster", "dim")
            .agg(F.avg(F.col("x").cast("double")).alias("mval"))
            .groupBy("s", "cluster")
            .agg(F.array_sort(F.collect_list(F.struct("dim", "mval"))).alias("dm"))
            .select(
                "s", "cluster", F.transform("dm", lambda t: t.getField("mval")).alias("c")
            )
            .collect()
        )
        new_books = [list(cb) for cb in codebooks]
        for r in means:
            new_books[r.s][r.cluster] = [float(x) for x in r.c]
        codebooks = new_books
    return codebooks


def pq_encode(
    df: DataFrame, codebooks: list[list[list[float]]], vec_col: str = "embedding"
) -> DataFrame:
    """Add ``code_0..code_{m-1}`` int columns (the stored PQ representation)."""
    sub = len(codebooks[0][0])
    out = df
    for s, cb in enumerate(codebooks):
        out = out.withColumn(
            f"code_{s}", _nearest_code(cb, F.slice(F.col(vec_col), s * sub + 1, sub))
        )
    return out


def pq_adc_distance(
    codebooks: list[list[list[float]]], query: list[float]
) -> Column:
    """Approximate ||query - vec||² as a sum of per-subspace LUT lookups.

    The LUTs are computed driver-side from the exact query (asymmetric):
    lut[s][j] = ||q_sub_s - codebook_s[j]||². The returned Column reads
    only the code columns — no vector access on the candidate pass.
    """
    sub = len(codebooks[0][0])
    terms = []
    for s, cb in enumerate(codebooks):
        qs = query[s * sub : (s + 1) * sub]
        lut = [sum((float(a) - float(b)) ** 2 for a, b in zip(qs, c)) for c in cb]
        lut_arr = F.array(*[F.lit(v) for v in lut])
        terms.append(F.element_at(lut_arr, F.col(f"code_{s}") + 1))
    dist = terms[0]
    for t in terms[1:]:
        dist = dist + t
    return dist


def pq_adc_cosine(codebooks: list[list[list[float]]], query: list[float]) -> Column:
    """Approximate cosine(query, vec) from codes alone — the MIPS/cosine
    variant of ADC. Two LUT families per subspace: query·centroid dot
    products and centroid squared norms; approx cosine =
    Σ dot_lut[code] / sqrt(Σ norm_lut[code]). Required when the ranking
    metric is cosine over UNNORMALIZED vectors: L2-ADC candidates rank by
    distance and systematically miss high-cosine/large-norm neighbors."""
    sub = len(codebooks[0][0])
    dot_terms, norm_terms = [], []
    for s, cb in enumerate(codebooks):
        qs = query[s * sub : (s + 1) * sub]
        dot_lut = [sum(float(a) * float(b) for a, b in zip(qs, c)) for c in cb]
        norm_lut = [sum(float(b) ** 2 for b in c) for c in cb]
        code = F.col(f"code_{s}") + 1
        dot_terms.append(F.element_at(F.array(*[F.lit(v) for v in dot_lut]), code))
        norm_terms.append(F.element_at(F.array(*[F.lit(v) for v in norm_lut]), code))
    dot = dot_terms[0]
    for t in dot_terms[1:]:
        dot = dot + t
    nrm = norm_terms[0]
    for t in norm_terms[1:]:
        nrm = nrm + t
    return dot / F.sqrt(nrm)


def build_ivfpq_index(
    df: DataFrame,
    centroids: DataFrame,
    codebooks: list[list[list[float]]],
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """IVF-PQ composition: assign each vector to its nearest IVF centroid
    AND store its PQ codes, written once partitioned by centroid_id. A
    probe then (a) prunes to nprobe partitions, and (b) scans m bytes of
    codes per vector for the candidate pass — the two reductions
    multiply: nprobe/C of the corpus × codes instead of floats. The full
    vector rides along for exact rescoring of the survivors (at extreme
    scale it would live in a separate id-keyed store)."""
    from .similarity import ivf_assign

    assigned = ivf_assign(df, centroids, id_col=id_col, vec_col=vec_col)
    encoded = pq_encode(assigned, codebooks, vec_col=vec_col)
    encoded.write.mode("overwrite").partitionBy("centroid_id").parquet(path)


def ivfpq_topk(
    spark,
    index_path: str,
    centroids: DataFrame,
    codebooks: list[list[list[float]]],
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 2,
    n_candidates: int = 120,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Search the IVF-PQ index: centroid scores pick nprobe partitions
    (partition-pruned scan), cosine-form ADC over the stored codes picks
    n_candidates, exact cosine rescoring over only those survivors
    returns the top-k. No stage touches more than nprobe/C of the corpus
    and only the rescore reads vectors."""
    from .similarity import cosine, select_probe_ids

    q = F.array(*[F.lit(float(x)) for x in query_vec])
    probe_ids = select_probe_ids(centroids, query_vec, nprobe)
    idx = spark.read.parquet(index_path).filter(F.col("centroid_id").isin(probe_ids))
    cand = (
        idx.withColumn("adc_cos", pq_adc_cosine(codebooks, query_vec))
        .orderBy(F.desc("adc_cos"), id_col)
        .limit(n_candidates)
    )
    return (
        cand.withColumn("cosine", F.round(cosine(F.col(vec_col), q), 6))
        .orderBy(F.desc("cosine"), id_col)
        .limit(k)
        .select(id_col, "cosine")
    )
