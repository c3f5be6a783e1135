"""LLM-data-pipeline queries (SURVEY §2.10 L1–L5 + text analysis).

The scale rationale for each operator lives in the operator modules
(`operators/text.py`, `operators/minhash.py`, `operators/similarity.py`,
`operators/multimodal.py`). Oracle notes:

- exact dedup, token stats, word freq, quality/lang, fingerprints, the
  multimodal carry-through, ALL five L5 media pipelines (PNG/WAV/motion-PNG
  outputs re-derived in DuckDB as character arithmetic), embedding near-dup
  (planted ground-truth pair set), and the l7 corpus-preparation family are
  SQL-checked;
- MinHash-LSH, SimHash, and the approximate ANN paths (IVF/PQ probes) are
  algorithm-specific (engine-internal hashes / probe subsets) → rows-only,
  pinned by unit tests;
- brute-force cosine top-k is SQL-checked via DuckDB's positional
  multi-unnest zip (scores rounded to 6 dp — cross-engine sum-order noise
  is ~1e-15, far below the rounding grain).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import dedup_exact_content
from ..operators.minhash import (
    bipartite_jaccard_pairs,
    containment_pairs,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signature,
    simhash64_df,
    simhash_near_dup_pairs,
)
from ..operators.multimodal import attach_media, extract_features
from ..operators.similarity import (
    build_ivf_index,
    ivf_topk_indexed,
    lsh_near_dup_pairs,
    seeded_centroids,
    topk_cosine,
)
from ..operators.text import (
    approx_token_count,
    fingerprint,
    language_id,
    quality_score,
    tokens,
)
from .base import register
from .helpers import T, davg, sql_davg


@register(
    "l1_exact_dedup_documents",
    oracle="""
SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
FROM documents
GROUP BY text
""",
    tags=("L1", "O4"),
)
def l1_exact_dedup_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L1: exact content dedup at scale — survivors chosen as min(doc_id)
    per sha2(text) group; shuffle carries the 64-char digest, not the doc."""
    d = T(spark, sf_dir, "documents")
    survivors = dedup_exact_content(d, content_col="text", id_col="doc_id")
    counts = d.groupBy("text").agg(F.count(F.lit(1)).alias("n_copies"))
    return (
        survivors.join(counts, "text")
        .select(F.col("doc_id").alias("keep_id"), "n_copies")
    )


@register(
    "l2_minhash_lsh_neardup",
    oracle=None,  # algorithm-specific (xxhash64 permutations) → rows-only
    tags=("L2",),
)
def l2_minhash_lsh_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2: MinHash(64) → LSH(16 bands × 4 rows) candidates → exact 3-gram
    Jaccard ≥ 0.5 verification on candidates only. Returns verified
    near-dup pairs; the all-pairs comparison never materializes."""
    d = T(spark, sf_dir, "documents")
    # persist (r15): the LSH band self-join consumes the signature frame on
    # BOTH sides and Spark re-runs the whole fan-out + shingle explode +
    # 64-min aggregate per side (r14 after-plan: two full sig pipelines,
    # zero ReusedExchange). Materializing the signatures — id + 64 longs
    # per doc, exactly the persistable LSH index the banded_signatures
    # docstring prescribes at scale — halves the heaviest pass. persist,
    # NOT localCheckpoint: a checkpoint leaf reports unknown size
    # (defaultSizeInBytes) and flipped the band join broadcast→sort-merge
    # at sf1 (measured 9.1 s → 17.0 s); the cached relation keeps stats.
    sig = minhash_signature(d, "text", k=64, w=3, id_cols=["doc_id"]).persist()
    cand = lsh_candidate_pairs(sig, "doc_id", bands=16, rows=4)
    verified = jaccard_pairs(d, "doc_id", "text", w=3, threshold=0.5, candidates=cand)
    return verified.orderBy("id_a", "id_b")


@register(
    "l2_simhash",
    oracle=None,  # engine-internal xxhash64 bit math → rows-only
    tags=("L2",),
)
def l2_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2: 64-bit SimHash near-dup — pairs at Hamming ≤ 12, candidates
    from ALL four 16-bit bands (union of bucket joins, deduped): any pair
    at Hamming ≤ 3 is guaranteed caught, and no single band concentrates
    the corpus into 2^16 buckets. Pure column math end-to-end. Bounded to
    a deterministic 250-doc slice: this synthetic corpus has a 31-word
    vocabulary, so near-dup pair count is inherently quadratic in it."""
    d = simhash64_df(
        T(spark, sf_dir, "documents").filter(F.col("doc_id") < 250), "doc_id", "text"
    ).persist()  # signatures are id+64 bits — tiny; both join sides reuse one pass
    return simhash_near_dup_pairs(d, "doc_id", "sh", max_hamming=12, bands=4).orderBy(
        "id_a", "id_b"
    )


@register(
    "l2_neardup_clusters",
    oracle="""
WITH RECURSIVE tok AS MATERIALIZED (
  SELECT doc_id, unnest(list_distinct(list_filter(string_split(text, ' '), t -> t != ''))) AS w
  FROM documents WHERE doc_id < 1000
),
sizes AS MATERIALIZED (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY 1),
common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
  FROM tok a JOIN tok b ON a.w = b.w AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS MATERIALIZED (
  SELECT id_a, id_b FROM common
  JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
  WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.9
),
edges_sym AS MATERIALIZED (SELECT id_a AS n, id_b AS m FROM pairs UNION ALL SELECT id_b, id_a FROM pairs),
nodes AS MATERIALIZED (SELECT DISTINCT doc_id FROM documents WHERE doc_id < 1000),
reach AS (
  SELECT doc_id AS node, doc_id AS lbl FROM nodes
  UNION
  SELECT e.m AS node, r.lbl FROM reach r JOIN edges_sym e ON r.node = e.n
),
comp AS (SELECT node, MIN(lbl) AS component FROM reach GROUP BY 1)
SELECT component, COUNT(*) AS n_docs FROM comp GROUP BY 1
""",
    tags=("L2", "L1"),
)
def l2_neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 cluster resolution: pairs are not enough for dedup — the keep/
    drop decision needs CONNECTED COMPONENTS of the similarity graph
    (keep min doc_id per component). Edges: exact word-Jaccard ≥ 0.9 on
    the deterministic 1000-doc slice (same arithmetic the l2_word_jaccard
    oracle pins); components via min-label propagation (operators/
    graph.py) — O(diameter) shuffles. The DuckDB oracle recomputes the
    components with a recursive CTE. Returns per-component doc counts."""
    from ..operators.graph import connected_components

    d = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    # candidates-first (the shape the docstring preaches): MinHash → banded
    # LSH → exact-Jaccard verify ONLY on candidates → components. At 16×4
    # bands a j≥0.9 pair escapes candidacy with prob (1−0.9⁴)¹⁶ ≈ 4e-8, so
    # the edge set ≡ the oracle's exact recursive-CTE edges; the corpus-wide
    # quadratic shingle self-join never runs.
    # persist (r15): the band self-join reads sig on both sides — without
    # it the whole signature pipeline runs twice (see l2_minhash_lsh_
    # neardup, including why persist rather than localCheckpoint: the
    # cached relation keeps size stats for the join-strategy choice).
    sig = minhash_signature(
        d.select("doc_id", "text"), "text", k=64, w=1, id_cols=["doc_id"]
    ).persist()
    cands = lsh_candidate_pairs(sig, "doc_id", bands=16, rows=4)
    edges = jaccard_pairs(d, "doc_id", "text", w=1, threshold=0.9, candidates=cands)
    comp = connected_components(
        d.select("doc_id"), edges, id_col="doc_id", src="id_a", dst="id_b"
    )
    return comp.groupBy("component").agg(F.count(F.lit(1)).alias("n_docs"))


@register(
    "l3_topk_cosine",
    oracle="""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT e.vec_id,
         CAST(unnest(e.embedding) AS DOUBLE) AS x,
         CAST(unnest((SELECT qv FROM q)) AS DOUBLE) AS y
  FROM embeddings e
),
agg AS (
  SELECT vec_id,
         SUM(x * y) / (SQRT(SUM(x * x)) * SQRT(SUM(y * y))) AS cs
  FROM scored GROUP BY vec_id
)
SELECT vec_id, ROUND(cs, 6) AS cos_sim
FROM agg
ORDER BY cos_sim DESC, vec_id
LIMIT 10
""",
    tags=("L3",),
)
def l3_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3 baseline: exact brute-force top-10 by cosine to the vec_id=0
    embedding. zip_with/aggregate folds (JVM, no UDF); TakeOrderedAndProject
    top-k (no global sort)."""
    e = T(spark, sf_dir, "embeddings")
    qvec = e.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    return topk_cosine(e, [float(x) for x in qvec], k=10, round_to=6)


@register(
    "l3_similarity_join",
    oracle="""
WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings WHERE vec_id < 5),
scored AS (
  SELECT q.q_id, e.vec_id,
         CAST(unnest(e.embedding) AS DOUBLE) AS x,
         CAST(unnest(q.q_vec) AS DOUBLE) AS y
  FROM embeddings e CROSS JOIN q
),
agg AS (
  SELECT q_id, vec_id,
         ROUND(SUM(x * y) / (SQRT(SUM(x * x)) * SQRT(SUM(y * y))), 6) AS cos_sim
  FROM scored GROUP BY q_id, vec_id
),
ranked AS (
  SELECT q_id, vec_id, cos_sim,
         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id) AS rn
  FROM agg
)
SELECT q_id, vec_id, cos_sim FROM ranked WHERE rn <= 5
""",
    tags=("L3", "W6"),
)
def l3_similarity_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3 batch shape: similarity JOIN — exact top-5 corpus neighbors for
    each of 5 query vectors in ONE pass (cross-corpus dedup / retrieval
    eval). Queries broadcast; scoring is JVM zip_with/aggregate folds;
    per-query WindowGroupLimit keeps k before any shuffle."""
    from ..operators.similarity import topk_cosine_join

    e = T(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    return topk_cosine_join(q, e, k=5, round_to=6)


@register(
    "l3_ivf_topk",
    oracle=None,  # approximate path (probe subset) → rows-only
    tags=("L3",),
)
def l3_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3 scale path: IVF top-10 over a PERSISTED seeded-centroid index —
    the corpus is assigned and written partitioned by centroid_id ONCE
    (cached per sf_dir), and each query reads only the nprobe=2 probed
    clusters' partitions (partition-pruned scan, ≈ nprobe/C of the corpus
    at scale). The assign-per-query `ivf_topk` remains in
    operators/similarity.py as the explicitly build-step-free baseline."""
    e = T(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in e.filter(F.col("vec_id") == 0).select("embedding").head()[0]]
    path, cents = _ivf_seeded_index_for(spark, sf_dir)
    return ivf_topk_indexed(spark, path, cents, qvec, k=10, nprobe=2)


_IVF_SEEDED_INDEX_CACHE: dict[str, tuple[str, list]] = {}


def _ivf_seeded_index_for(spark: SparkSession, sf_dir: str):
    """Materialize the seeded-centroid IVF index once per corpus (write-
    once partitioned layout; probes prune partitions — never re-assign).
    Returns (index_path, centroid_rows); the LOCAL centroid rows feed
    ``select_probe_ids`` directly, so a probe against a cached index runs
    zero Spark jobs before the partition-pruned scan."""
    import os
    import tempfile

    got = _IVF_SEEDED_INDEX_CACHE.get(sf_dir)
    if got is not None and os.path.isdir(got[0]):
        return got
    e = T(spark, sf_dir, "embeddings")
    cents = seeded_centroids(e, c=8)
    rows = [(r["centroid_id"], list(r["centroid_vec"])) for r in cents.collect()]
    path = tempfile.mkdtemp(prefix="rdl_ivf_seed_idx_")
    cents_df = spark.createDataFrame(rows, ["centroid_id", "centroid_vec"])
    build_ivf_index(e, cents_df, path)
    _IVF_SEEDED_INDEX_CACHE[sf_dir] = (path, rows)
    return path, rows


def _with_planted_neardups(e: DataFrame, n_pairs: int = 20, id_offset: int = 1_000_000) -> DataFrame:
    """Union the corpus with ``n_pairs`` PLANTED near-duplicates: for each
    vec_id < n_pairs, a clone at id+offset with a deterministic ±3%
    per-coordinate multiplicative jitter (cosine ≈ 0.9995 to its source —
    a true near-dup; cosine to everything else stays random ≈ 0). JVM-side
    transform, no UDF; the planted ids are the known ground truth for the
    production-threshold recall check."""
    clones = e.filter(F.col("vec_id") < n_pairs).select(
        (F.col("vec_id") + id_offset).alias("vec_id"),
        F.expr(
            "transform(embedding, (x, i) -> CAST(x * (1.0 + 0.03 * sin(CAST(i AS DOUBLE) + CAST(vec_id AS DOUBLE))) AS FLOAT))"
        ).alias("embedding"),
    )
    return e.select("vec_id", "embedding").unionByName(clones)


@register(
    "l3_embedding_neardup",
    # The LSH bucketing is engine-internal, but the VERIFIED OUTPUT is an
    # exact property of the data: the pair set with true cosine >= 0.9.
    # DuckDB rebuilds the planted clones (same jitter formula) and scores
    # all pairs exactly — so the gate hash-checks that banded LSH +
    # verification finds precisely the ground-truth set (recall 1.0, no
    # false positives), not merely the row count. Scores are withheld from
    # the output (float32-vs-float64 clone quantization shifts them ~1e-8;
    # the >=0.9 decision sits 0.1 away from the boundary on planted pairs
    # and ~0.5 away on random ones, so membership is ulp-insensitive).
    oracle="""
WITH corpus AS (
  SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS v FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000,
         [CAST(embedding[i+1] AS DOUBLE)
            * (1.0 + 0.03 * sin(CAST(i AS DOUBLE) + CAST(vec_id AS DOUBLE)))
          for i in range(0, len(embedding))]
  FROM embeddings WHERE vec_id < 20),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         list_sum([a.v[i] * b.v[i] for i in range(1, len(a.v)+1)])
           / (sqrt(list_sum([x*x for x in a.v]))
              * sqrt(list_sum([x*x for x in b.v]))) AS cs
  FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id)
SELECT id_a, id_b FROM pairs WHERE cs >= 0.9
""",
    tags=("L3", "L2"),
)
def l3_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup AT THE PRODUCTION THRESHOLD (cos ≥ 0.9):
    the synthetic corpus is random (no true near-dups), so 20 genuine
    near-duplicate pairs are PLANTED (deterministic ±3% jitter clones,
    cosine ≈ 0.9995) and must all be recovered — banded hyperplane LSH
    (3 bands × 8 bits: any-band match → candidate) with exact-cosine
    verification inside candidates only. The DuckDB oracle recomputes the
    ground-truth pair set by exact all-pairs cosine, so the hash check IS
    the recall/precision proof; tests/test_llm_ops.py additionally pins
    the planted ids."""
    e = T(spark, sf_dir, "embeddings")
    corpus = _with_planted_neardups(e)
    return (
        lsh_near_dup_pairs(corpus, n_planes=24, n_bands=3, threshold=0.9, dim=64)
        .select("id_a", "id_b")
        .orderBy("id_a", "id_b")
    )


@register(
    "l4_text_stats",
    oracle="""
SELECT doc_id,
       len(list_filter(string_split(text, ' '), t -> t != '')) AS n_tokens,
       LENGTH(text) AS n_chars,
       len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS approx_tokens,
       len(list_distinct(list_filter(string_split(text, ' '), t -> t != ''))) AS n_distinct_tokens
FROM documents
""",
    tags=("L4",),
)
def l4_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4: per-document token/char counts — whitespace tokens + BPE-ish
    regex segmentation, all JVM-side column ops."""
    d = T(spark, sf_dir, "documents")
    t = tokens("text")
    return d.select(
        "doc_id",
        F.size(t).cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars"),
        approx_token_count("text").alias("approx_tokens"),
        F.size(F.array_distinct(t)).cast("long").alias("n_distinct_tokens"),
    )


@register(
    "l4_word_frequency",
    oracle="""
SELECT word, COUNT(*) AS n
FROM (SELECT unnest(list_filter(string_split(text, ' '), t -> t != '')) AS word
      FROM documents)
GROUP BY 1
ORDER BY n DESC, word
LIMIT 20
""",
    tags=("L4", "U5"),
)
def l4_word_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4: corpus word frequency (explode → two-phase count), top-20 with
    lexicographic tie-break — the UDTF one-row→many-rows pattern (U5)."""
    d = T(spark, sf_dir, "documents")
    return (
        d.select(F.explode(tokens("text")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(20)
    )


@register(
    "l4_quality_language",
    oracle=f"""
WITH scored AS (
  SELECT doc_id, lang,
         CASE WHEN len(list_intersect(list_filter(string_split(text,' '), t -> t != ''),
                                      ['the','and','of'])) > 0 THEN 'en'
              WHEN len(list_intersect(list_filter(string_split(text,' '), t -> t != ''),
                                      ['el','la','de','y'])) > 0 THEN 'es'
              WHEN len(list_intersect(list_filter(string_split(text,' '), t -> t != ''),
                                      ['der','die','und'])) > 0 THEN 'de'
              ELSE 'unknown' END AS lang_pred,
         0.4 * LEAST(len(list_filter(string_split(text,' '), t -> t != '')) / 100.0, 1.0)
         + 0.3 * (len(list_distinct(list_filter(string_split(text,' '), t -> t != '')))
                  / GREATEST(CAST(len(list_filter(string_split(text,' '), t -> t != '')) AS DOUBLE), 1.0))
         + 0.3 * (1.0 - len(list_filter(string_split(text,' '),
                                        t -> t IN ('the','a','of','and','to','in','is')))
                        / GREATEST(CAST(len(list_filter(string_split(text,' '), t -> t != '')) AS DOUBLE), 1.0))
           AS q
  FROM documents
)
SELECT lang_pred, lang, COUNT(*) AS n_docs, {sql_davg("q", scale=8, out_round=6)} AS avg_quality
FROM scored
GROUP BY 1, 2
""",
    tags=("L4",),
)
def l4_quality_language(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4: language-ID heuristic × labeled lang, with the closed-form
    quality score (length/diversity/stopword mix) averaged per cell."""
    d = T(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        "lang",
        language_id("text").alias("lang_pred"),
        quality_score("text").alias("q"),
    )
    return scored.groupBy("lang_pred", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        davg("q", scale=8, out_round=6).alias("avg_quality"),
    )


@register(
    "l4_fingerprint_groups",
    oracle="""
SELECT md5(array_to_string(list_filter(string_split(lower(text), ' '), t -> t != ''), ' ')) AS fp,
       COUNT(*) AS n_docs,
       MIN(doc_id) AS first_doc
FROM documents
GROUP BY 1
""",
    tags=("L4", "L1"),
)
def l4_fingerprint_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4: md5 fingerprint over normalized text (case/whitespace-folded) —
    the exact-dup key that survives trivial reformatting."""
    d = T(spark, sf_dir, "documents")
    return (
        d.select(fingerprint("text").alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("first_doc"))
    )


@register(
    "l4_winnowing_fingerprints",
    oracle=None,  # engine-internal xxhash64 k-gram hashes → rows-only
    tags=("L4", "L2"),
)
def l4_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4: winnowing rolling-hash fingerprints (k=8 char-grams, window 4)
    — the partial-overlap detector exact md5 fingerprints can't be: any
    shared substring ≥ 11 chars yields a shared fingerprint. Per-doc
    fingerprint stats here; the pair-sharing guarantee is pinned by
    tests/test_llm_ops.py on planted overlapping docs."""
    from ..operators.text import winnow_fingerprint_stats

    # r14 opt: explode + codegen hash + native sliding-window min instead
    # of the nested higher-order functions (interpreted per element —
    # 21.5 s at sf0.1); value-identical, ~20× faster. See the operator's
    # docstring.
    return winnow_fingerprint_stats(
        T(spark, sf_dir, "documents"), "doc_id", "text", k=8, w=4
    )


@register(
    "l5_multimodal_carry",
    oracle="""
SELECT doc_id,
       LENGTH(text) AS payload_bytes,
       LENGTH(text) AS meta_width,
       'image' AS media_type
FROM documents
WHERE n_chars >= 200
""",
    tags=("L5",),
)
def l5_multimodal_carry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5: binary payload + typed metadata struct carried losslessly
    through filter/projection; byte length + struct fields re-emerge intact
    (testdata text is ASCII, so chars == bytes for the oracle)."""
    d = T(spark, sf_dir, "documents")
    media = attach_media(d.filter(F.col("n_chars") >= 200))
    return media.select(
        "doc_id",
        F.octet_length("payload").cast("long").alias("payload_bytes"),
        F.col("meta.width").cast("long").alias("meta_width"),
        F.col("meta.media_type").alias("media_type"),
    )


@register(
    "l5_feature_extraction",
    oracle="""
SELECT doc_id,
       LENGTH(text) AS n_bytes,
       CAST(list_sum([ord(substr(text, i, 1)) for i in range(1, LENGTH(text)+1)])
            % 2147483648 AS BIGINT) AS checksum,
       CAST(CAST(list_sum([ord(substr(text, i, 1)) for i in range(1, LENGTH(text)+1)])
            % 997 AS BIGINT) AS DOUBLE) AS f1
FROM documents
""",
    tags=("L5", "U2"),
)
def l5_feature_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5: Arrow-batched mapInPandas feature extraction over binary
    payloads (deterministic byte-arithmetic features; a real encoder
    slots into the same mapInPandas shape). The payload is the utf-8
    text (ASCII corpus), so the byte checksums are re-derivable in pure
    SQL — the Python decode path is hash-checked against DuckDB
    character arithmetic, not just row-counted."""
    d = T(spark, sf_dir, "documents")
    media = attach_media(d)
    feats = extract_features(media)
    return feats.select("doc_id", "n_bytes", "checksum", F.element_at("features", 2).alias("f1"))


_IVF_INDEX_CACHE: dict[str, tuple[str, list[list[float]]]] = {}


def _centroids_df(spark, cents):
    from ..operators.kmeans import centroids_df

    return centroids_df(spark, cents)


def _ivf_index_for(spark: SparkSession, sf_dir: str):
    """Train (k-means) + materialize the IVF index ONCE per corpus: the
    assignment is a write-once partition key, not per-query work. Cached
    by sf_dir; the index outlives the query (and the SparkSession)."""
    import os
    import tempfile

    from ..operators.kmeans import kmeans_fit

    got = _IVF_INDEX_CACHE.get(sf_dir)
    if got is not None and os.path.isdir(got[0]):
        return got
    e = T(spark, sf_dir, "embeddings")
    cents = kmeans_fit(e, k=8, max_iters=3)
    path = tempfile.mkdtemp(prefix="rdl_ivf_idx_")
    build_ivf_index(e, _centroids_df(spark, cents), path)
    _IVF_INDEX_CACHE[sf_dir] = (path, cents)
    return path, cents


@register(
    "l3_ivf_kmeans_topk",
    oracle=None,  # approximate (probe subset, trained centroids) → rows-only
    tags=("L3",),
)
def l3_ivf_kmeans_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3 scale path with TRAINED centroids and a PERSISTED index:
    k-means (3 Lloyd iterations, operators/kmeans.py) trains 8 centroids,
    the corpus is written once partitioned by centroid_id, and the query
    reads only the nprobe=2 probed clusters' partitions — a partition-
    pruned parquet scan, not a corpus re-score (tests/test_llm_ops.py
    pins recall; tools/explain_audit.py pins the partition filter)."""
    e = T(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in e.filter(F.col("vec_id") == 0).select("embedding").head()[0]]
    path, cents = _ivf_index_for(spark, sf_dir)
    # cents is the driver-local trained-centroid list: probe selection is
    # pure driver math, only the pruned scan touches the cluster
    return ivf_topk_indexed(spark, path, cents, qvec, k=10, nprobe=2)


@register(
    "l2_word_jaccard",
    oracle="""
WITH tok AS (
  SELECT doc_id, unnest(list_distinct(list_filter(string_split(text, ' '), t -> t != ''))) AS w
  FROM documents WHERE doc_id < 1000
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY 1),
common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
  FROM tok a JOIN tok b ON a.w = b.w AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       c * 1.0 / (sa.n + sb.n - c) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.9
""",
    tags=("L2",),
)
def l2_word_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 SQL-checked variant: exact word-level (w=1) Jaccard ≥ 0.9 via
    the explode + shared-token self-join path — pins the n-gram Jaccard
    arithmetic against DuckDB. Bounded to a deterministic 1000-doc slice
    (both sides): exact all-pairs Jaccard is quadratic by nature — this
    corpus has a 31-word vocabulary, so every doc pairs with every other.
    The MinHash-LSH pipeline is the unbounded-scale path."""
    d = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    return jaccard_pairs(d, "doc_id", "text", w=1, threshold=0.9)


@register(
    "l3_pq_topk",
    oracle=None,  # approximate (trained codebooks, quantization grid) → rows-only
    tags=("L3",),
)
def l3_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (operators/pq.py): 8 subspaces × 16-code
    codebooks trained with the DataFrame k-means, vectors stored as 8
    one-byte codes (32× smaller scan set than float32), candidates scored
    by asymmetric LUT lookups in cosine form (pure codegen — element_at
    on broadcast literal tables, no vector access), top-120 rescored with
    exact float cosine for the final top-10. The candidate pool exceeds
    the corpus blob size — within-cluster ordering is reconstruction-
    noise-dominated for ANY quantizer, so recall comes from pool width +
    exact rescoring, not from trusting ADC's in-cluster ranking. Recall vs exact brute force
    pinned by tests/test_advanced.py. Composes with the IVF partition
    layout as IVF-PQ at corpus scale."""
    from ..operators.pq import pq_adc_cosine, pq_encode

    emb = T(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    codebooks = _pq_codebooks_for(spark, sf_dir)
    qrow = [float(x) for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]]

    encoded = pq_encode(emb.filter(F.col("vec_id") != 0), codebooks)
    cand = (
        encoded.withColumn("adc_cos", pq_adc_cosine(codebooks, qrow))
        .orderBy(F.desc("adc_cos"), "vec_id")
        .limit(120)
    )

    qf = F.lit([float(x) for x in qrow])
    dot = F.aggregate(
        F.zip_with("embedding", qf, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
    )
    vnorm = F.sqrt(
        F.aggregate("embedding", F.lit(0.0), lambda acc, x: acc + x * x)
    )
    qnorm = sum(x * x for x in qrow) ** 0.5
    return (
        cand.withColumn("cosine", F.round(dot / (vnorm * F.lit(qnorm)), 6))
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(10)
        .select("vec_id", "cosine")
    )


_CORPUS_Q_SQL = """
0.4 * LEAST(len(list_filter(string_split(text,' '), t -> t != '')) / 100.0, 1.0)
+ 0.3 * (len(list_distinct(list_filter(string_split(text,' '), t -> t != '')))
         / GREATEST(CAST(len(list_filter(string_split(text,' '), t -> t != '')) AS DOUBLE), 1.0))
+ 0.3 * (1.0 - len(list_filter(string_split(text,' '),
                               t -> t IN ('the','a','of','and','to','in','is')))
               / GREATEST(CAST(len(list_filter(string_split(text,' '), t -> t != '')) AS DOUBLE), 1.0))
"""

_CORPUS_PIPELINE_SQL = f"""
WITH RECURSIVE pool AS MATERIALIZED (
  SELECT doc_id, text FROM documents WHERE doc_id < 450),
scored AS (
  SELECT doc_id, text,
         CASE WHEN len(list_intersect(list_filter(string_split(text,' '), t -> t != ''),
                                      ['the','and','of'])) > 0 THEN 'en'
              WHEN len(list_intersect(list_filter(string_split(text,' '), t -> t != ''),
                                      ['el','la','de','y'])) > 0 THEN 'es'
              WHEN len(list_intersect(list_filter(string_split(text,' '), t -> t != ''),
                                      ['der','die','und'])) > 0 THEN 'de'
              ELSE 'unknown' END AS lang_pred,
         {_CORPUS_Q_SQL} AS q
  FROM pool),
gated AS (SELECT * FROM scored WHERE q >= 0.6 AND lang_pred <> 'unknown'),
exact AS (
  SELECT doc_id, text, lang_pred, q,
         ROW_NUMBER() OVER (
           PARTITION BY md5(array_to_string(list_filter(string_split(lower(text), ' '), t -> t != ''), ' '))
           ORDER BY doc_id) AS rn
  FROM gated),
ex_surv AS MATERIALIZED (SELECT doc_id, text, lang_pred, q FROM exact WHERE rn = 1),
tok AS MATERIALIZED (
  SELECT doc_id, unnest(list_distinct(list_filter(string_split(text, ' '), t -> t != ''))) AS w
  FROM ex_surv),
sizes AS MATERIALIZED (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY 1),
common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
  FROM tok a JOIN tok b ON a.w = b.w AND a.doc_id < b.doc_id GROUP BY 1, 2),
pairs AS MATERIALIZED (
  SELECT id_a, id_b FROM common
  JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
  WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.9),
edges_sym AS MATERIALIZED (SELECT id_a AS n, id_b AS m FROM pairs UNION ALL SELECT id_b, id_a FROM pairs),
reach AS (
  SELECT doc_id AS node, doc_id AS lbl FROM ex_surv
  UNION
  SELECT e.m AS node, r.lbl FROM reach r JOIN edges_sym e ON r.node = e.n),
comp AS (SELECT node, MIN(lbl) AS component FROM reach GROUP BY 1),
near_surv AS (
  SELECT s.* FROM ex_surv s JOIN comp ON s.doc_id = comp.node
  WHERE s.doc_id = (SELECT MIN(c2.node) FROM comp c2 WHERE c2.component = comp.component)),
esh AS (
  SELECT DISTINCT s FROM (
    SELECT unnest([l[i] || ' ' || l[i+1] || ' ' || l[i+2]
                   FOR i IN generate_series(1, len(l) - 2)]) AS s
    FROM (SELECT string_split(lower(text), ' ') AS l FROM documents WHERE doc_id >= 450)
    WHERE len(l) >= 3)),
clean AS (
  SELECT n.* FROM near_surv n
  WHERE NOT EXISTS (
    SELECT 1 FROM (
      SELECT unnest([l[i] || ' ' || l[i+1] || ' ' || l[i+2]
                     FOR i IN generate_series(1, len(l) - 2)]) AS s
      FROM (SELECT string_split(lower(n.text), ' ') AS l)
      WHERE len(l) >= 3) t
    JOIN esh ON t.s = esh.s))
SELECT lang_pred, COUNT(*) AS n_docs,
       CAST(SUM(len(list_filter(string_split(text,' '), t -> t != ''))) AS BIGINT) AS total_tokens,
       ROUND(CAST(SUM(CAST(q AS DECIMAL(25,8))) AS DOUBLE) / COUNT(*), 6) AS avg_quality
FROM clean GROUP BY lang_pred
"""


@register("l6_corpus_pipeline", oracle=_CORPUS_PIPELINE_SQL, tags=("L1", "L2", "L4"))
def l6_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-corpus curation — the composition the individual
    L* operators exist for, as ONE dataflow:

      1. quality + language gate (closed-form column math, q >= 0.6);
      2. exact dedup on the normalized fingerprint (keep min doc_id);
      3. near-dup collapse: word-Jaccard >= 0.9 edges -> connected
         components -> keep the min doc per cluster;
      4. contamination screen: drop any survivor sharing a word-trigram
         shingle with the held-out slice (doc_id >= 450);
      5. corpus stats per predicted language.

    Every stage is a shuffle on a content key (fingerprint, token,
    shingle, component label) — nothing pairwise, nothing driver-side.
    The DuckDB oracle recomputes all five stages (recursive CTE for the
    components), so the hash pins the whole pipeline end to end."""
    from ..operators.graph import connected_components

    d = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 450)
    scored = d.select(
        "doc_id",
        "text",
        language_id("text").alias("lang_pred"),
        quality_score("text").alias("q"),
    )
    gated = scored.filter((F.col("q") >= 0.6) & (F.col("lang_pred") != "unknown"))

    from pyspark.sql import Window

    w_fp = Window.partitionBy(fingerprint("text")).orderBy("doc_id")
    # localCheckpoint (r15): ex_surv feeds the jaccard edges (both sides of
    # the shingle self-join), the component node list, and the near_surv
    # join — five-plus subtree evaluations of scan→score→window-dedup with
    # zero exchange reuse. The frame is SF-CONSTANT (< 450 docs by the
    # doc_id gate), so materializing it is bounded at any corpus scale.
    ex_surv = (
        gated.withColumn("rn", F.row_number().over(w_fp))
        .filter(F.col("rn") == 1)
        .drop("rn")
        .localCheckpoint()
    )

    edges = jaccard_pairs(ex_surv, "doc_id", "text", w=1, threshold=0.9)
    comp = connected_components(
        ex_surv.select("doc_id"), edges, id_col="doc_id", src="id_a", dst="id_b"
    )
    keep = comp.groupBy("component").agg(F.min("doc_id").alias("doc_id")).select("doc_id")
    near_surv = ex_surv.join(keep, "doc_id")

    trigrams = F.array_distinct(
        F.expr(
            "transform(sequence(0, size(l) - 3), i -> concat_ws(' ', l[i], l[i+1], l[i+2]))"
        )
    )
    from ..operators.parallelism import fan_out

    # r14 opt: the held-out slice is 90% of a single-split parquet scan —
    # without fan_out the trigram explode serializes on one task (guide
    # §2.5 input skew; no-op when the scan is already parallel).
    eval_sh = (
        fan_out(T(spark, sf_dir, "documents").filter(F.col("doc_id") >= 450))
        .select(F.split(F.lower("text"), " ").alias("l"))
        .filter(F.size("l") >= 3)
        .select(F.explode(trigrams).alias("s"))
        .distinct()
    )
    surv_sh = (
        near_surv.select("doc_id", F.split(F.lower("text"), " ").alias("l"))
        .filter(F.size("l") >= 3)
        .select("doc_id", F.explode(trigrams).alias("s"))
    )
    contaminated = surv_sh.join(F.broadcast(eval_sh), "s").select("doc_id").distinct()
    clean = near_surv.join(contaminated, "doc_id", "left_anti")

    n_tokens = F.size(tokens("text")).cast("long")
    return clean.groupBy("lang_pred").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n_tokens).alias("total_tokens"),
        davg("q", scale=8, out_round=6).alias("avg_quality"),
    )


@register(
    "l5_image_thumbnail",
    # The full pipeline is byte-deterministic: payload = first 768 bytes of
    # repeat(text); PNG encode→decode is lossless; the 16x16→4x4 nearest
    # resize keeps rows/cols {0,4,8,12}. So px_sum/corners are re-derivable
    # in SQL as character arithmetic at the 48 surviving byte positions —
    # the codec + resize output is hash-checked, not just row-counted.
    oracle="""
WITH p AS (
  SELECT doc_id, substr(repeat(text, 97), 1, 768) AS pay FROM documents
  WHERE LENGTH(repeat(text, 97)) >= 768)
SELECT doc_id, 4 AS out_w, 4 AS out_h,
       CAST(list_sum([ord(substr(pay, p, 1)) for p in
         [1,2,3,13,14,15,25,26,27,37,38,39,193,194,195,205,206,207,
          217,218,219,229,230,231,385,386,387,397,398,399,409,410,411,
          421,422,423,577,578,579,589,590,591,601,602,603,613,614,615]])
         AS BIGINT) AS px_sum,
       ord(substr(pay, 1, 1)) AS top_left,
       ord(substr(pay, 615, 1)) AS bottom_right
FROM p
""",
    tags=("L5", "U3"),
)
def l5_image_thumbnail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5 with a REAL compressed-image pipeline (stdlib PNG codec): each
    document's bytes are tiled into a 16x16 rgb8 raw image JVM-side
    (repeat/encode/binary-substring — deterministic), an Arrow-batched
    encode stage compresses each to real PNG bytes (zlib deflate + chunk
    framing), and a second mapInPandas stage DECODES the PNG (inflate +
    scanline unfilter), nearest-neighbor-resizes to 4x4, and emits exact
    pixel sums. bytes→PNG→pixels end-to-end, no codec library, nothing
    stubbed. Exact pixel math + filter unfiltering pinned by
    tests/test_llm_ops.py / tests/test_png.py."""
    from ..operators.multimodal import encode_rgb_png, png_thumbnail

    need = 16 * 16 * 3
    reps = need // 8 + 1  # min text length is ~8 chars; tile well past `need`
    d = T(spark, sf_dir, "documents").select("doc_id", "text")
    payloads = d.select(
        "doc_id",
        F.expr(f"substring(encode(repeat(text, {reps}), 'UTF-8'), 1, {need})").alias(
            "payload"
        ),
    ).filter(F.octet_length("payload") == need)
    pngs = encode_rgb_png(payloads, src_w=16, src_h=16)
    return png_thumbnail(pngs, out_w=4, out_h=4)


_PQ_CODEBOOK_CACHE: dict[str, list[list[list[float]]]] = {}


def _pq_codebooks_for(spark: SparkSession, sf_dir: str):
    """Train PQ codebooks ONCE per corpus (shared by l3_pq_topk and the
    IVF-PQ index). Trains on a deterministic half-sample: quantizer
    quality needs representative cluster structure, not every row — the
    standard PQ practice (train on ~100k of a billion)."""
    from ..operators.pq import pq_train

    got = _PQ_CODEBOOK_CACHE.get(sf_dir)
    if got is not None:
        return got
    emb = T(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cb = pq_train(emb.filter(F.col("vec_id") % 2 == 0), m=8, k=16, max_iters=2)
    _PQ_CODEBOOK_CACHE[sf_dir] = cb
    return cb


_IVFPQ_CACHE: dict[str, tuple[str, list[list[float]], list[list[list[float]]]]] = {}


def _ivfpq_index_for(spark: SparkSession, sf_dir: str):
    """Train (k-means centroids + PQ codebooks) and materialize the
    IVF-PQ index ONCE per corpus; cached by sf_dir like _ivf_index_for."""
    import os
    import tempfile

    from ..operators.pq import build_ivfpq_index

    got = _IVFPQ_CACHE.get(sf_dir)
    if got is not None and os.path.isdir(got[0]):
        return got
    e = T(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    path, cents = _ivf_index_for(spark, sf_dir)  # reuse the trained centroids
    codebooks = _pq_codebooks_for(spark, sf_dir)  # reuse the trained codebooks
    pq_path = tempfile.mkdtemp(prefix="rdl_ivfpq_idx_")
    build_ivfpq_index(e, _centroids_df(spark, cents), codebooks, pq_path)
    _IVFPQ_CACHE[sf_dir] = (pq_path, cents, codebooks)
    return _IVFPQ_CACHE[sf_dir]


@register(
    "l3_ivfpq_topk",
    oracle=None,  # approximate (probe subset + quantized candidates) → rows-only
    tags=("L3",),
)
def l3_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3 full scale path — IVF-PQ composition (operators/pq.py): the
    persisted index is partitioned by trained IVF centroid AND stores
    8-byte PQ codes per vector; a probe prunes to nprobe=2 partitions,
    ADC-scores the codes (cosine-form LUTs, pure codegen), and only the
    top-120 candidates get exact rescoring. The two reductions multiply:
    nprobe/C of the corpus scanned × 32x smaller candidate rows. Recall
    vs exact brute force pinned in tests/test_advanced.py; the partition
    filter is plan-audited."""
    from ..operators.pq import ivfpq_topk

    e = T(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in e.filter(F.col("vec_id") == 0).select("embedding").head()[0]]
    pq_path, cents, codebooks = _ivfpq_index_for(spark, sf_dir)
    return ivfpq_topk(spark, pq_path, cents, codebooks, qvec, k=10, nprobe=2)


# ---------------------------------------------- corpus preparation (L7)
#
# The last mile of a training-data pipeline after filter/dedup: split the
# corpus deterministically, pack documents into fixed token budgets, scrub
# PII, and score pathological repetition. All four are pure column math /
# window arithmetic — SQL-checked against DuckDB.


@register(
    "l7_corpus_split",
    oracle="""
WITH d AS (
  SELECT doc_id,
         substr(md5(text), 1, 1) AS b,
         len(list_filter(string_split(text, ' '), t -> t != '')) AS n_tokens
  FROM documents),
s AS (
  SELECT doc_id, n_tokens,
         CASE WHEN b BETWEEN '0' AND '9' OR b IN ('a', 'b') THEN 'train'
              WHEN b IN ('c', 'd') THEN 'val'
              ELSE 'test' END AS split
  FROM d)
SELECT split, COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       MIN(doc_id) AS first_doc
FROM s GROUP BY split
""",
    tags=("L4", "F1"),
)
def l7_corpus_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic content-hash corpus split (train/val/test ≈ 12/2/2 of
    16 md5 nibble buckets). Hash-of-CONTENT, not row number or RNG: the
    assignment is stable under re-ingestion, reshuffling, and cluster
    topology — the property that keeps eval sets fixed as a 100 TB corpus
    is rebuilt. One narrow scan, one two-phase agg; both engines compute
    the identical md5 nibble so the gate hash-checks the split exactly."""
    d = T(spark, sf_dir, "documents").select(
        "doc_id",
        F.substring(F.md5(F.col("text").cast("binary")), 1, 1).alias("b"),
        F.size(F.filter(F.split("text", " "), lambda t: t != F.lit(""))).alias("n_tokens"),
    )
    split = (
        F.when(F.col("b").between("0", "9") | F.col("b").isin("a", "b"), "train")
        .when(F.col("b").isin("c", "d"), "val")
        .otherwise("test")
    )
    return (
        d.select(split.alias("split"), "n_tokens", "doc_id")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.min("doc_id").alias("first_doc"),
        )
    )


@register(
    "l7_sequence_packing",
    oracle="""
WITH d AS (
  SELECT doc_id, doc_id % 8 AS shard,
         len(list_filter(string_split(text, ' '), t -> t != '')) AS n_tokens
  FROM documents),
packed AS (
  SELECT shard, doc_id, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - n_tokens AS start_offset
  FROM d)
SELECT shard, CAST(FLOOR(start_offset / 512) AS BIGINT) AS bin_id,
       COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       MIN(doc_id) AS first_doc
FROM packed
GROUP BY shard, bin_id
""",
    tags=("W3", "L4"),
)
def l7_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing (concat-then-chunk): documents stream in stable
    doc_id order within each shard; a running token offset assigns each
    doc to the 512-token training bin its first token falls in — the
    standard LLM pretraining packing layout. Spark spelling: one window
    running-sum per shard (single hash exchange on shard), no UDF; at
    100 TB shards are the parallelism unit and each bin is one packed
    training sequence. Bin manifests (doc counts, token counts, first
    doc) are hash-checked against the identical window arithmetic."""
    from pyspark.sql import Window

    d = T(spark, sf_dir, "documents").select(
        "doc_id",
        (F.col("doc_id") % 8).alias("shard"),
        F.size(F.filter(F.split("text", " "), lambda t: t != F.lit(""))).alias("n_tokens"),
    )
    w = Window.partitionBy("shard").orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    packed = d.withColumn("start_offset", F.sum("n_tokens").over(w) - F.col("n_tokens"))
    return (
        packed.select(
            "shard",
            F.floor(F.col("start_offset") / 512).alias("bin_id"),
            "n_tokens",
            "doc_id",
        )
        .groupBy("shard", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.min("doc_id").alias("first_doc"),
        )
    )


_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"555-[0-9]{4}"


@register(
    "l4_pii_redaction",
    oracle=f"""
WITH aug AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0
              THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                        || '@example.com or 555-0142'
              ELSE text END AS text
  FROM documents),
red AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '{_EMAIL_RE}')) AS n_emails,
         len(regexp_extract_all(text, '{_PHONE_RE}')) AS n_phones,
         regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                        '{_PHONE_RE}', '<PHONE>', 'g') AS redacted
  FROM aug)
SELECT doc_id, n_emails, n_phones, LENGTH(redacted) AS redacted_len
FROM red
WHERE n_emails > 0 OR n_phones > 0
""",
    tags=("L4", "F1"),
)
def l4_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing — the compliance pass every training corpus runs:
    regex-detect emails and phone-shaped strings, count them, and redact
    with typed placeholders. (The synthetic corpus is PII-free, so every
    7th doc is AUGMENTED with a deterministic email + phone in both
    engines — the detector must find exactly those.) Pure JVM
    regexp_count/regexp_replace — patterns chosen in the regex subset
    where Java and RE2 agree; counts, and the redacted lengths, are
    hash-checked."""
    aug = T(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com or 555-0142"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    red = aug.select(
        "doc_id",
        F.regexp_count("text", F.lit(_EMAIL_RE)).alias("n_emails"),
        F.regexp_count("text", F.lit(_PHONE_RE)).alias("n_phones"),
        F.regexp_replace(
            F.regexp_replace("text", _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
        ).alias("redacted"),
    )
    return red.filter((F.col("n_emails") > 0) | (F.col("n_phones") > 0)).select(
        "doc_id", "n_emails", "n_phones", F.length("redacted").alias("redacted_len")
    )


@register(
    "l4_repetition_score",
    oracle="""
WITH d AS (
  SELECT doc_id, list_filter(string_split(lower(text), ' '), t -> t != '') AS toks
  FROM documents),
t3 AS (
  SELECT doc_id,
         unnest([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                 for i in range(1, len(toks) - 1)]) AS tri
  FROM d WHERE len(toks) >= 3),
cnt AS (SELECT doc_id, tri, COUNT(*) AS c FROM t3 GROUP BY doc_id, tri),
agg AS (
  SELECT doc_id, MAX(c) AS max_tri, CAST(SUM(c) AS BIGINT) AS n_tris
  FROM cnt GROUP BY doc_id)
SELECT doc_id, max_tri, n_tris,
       CAST(max_tri AS DOUBLE) / n_tris AS rep_ratio,
       CASE WHEN CAST(max_tri AS DOUBLE) / n_tris > 0.2 THEN 1 ELSE 0 END AS flagged
FROM agg
""",
    tags=("L4",),
)
def l4_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition scoring (the Gopher/MassiveText quality rule family):
    fraction of a document's trigrams taken by its single most-repeated
    trigram — boilerplate and degenerate generations score high and get
    flagged (> 0.2). JVM-side trigram expansion (sequence+transform, no
    UDF), two hash aggs keyed (doc_id, tri) then doc_id; the ratio is an
    exact integer division in both engines so the hash is
    ulp-insensitive."""
    d = T(spark, sf_dir, "documents").select(
        "doc_id",
        F.filter(F.split(F.lower("text"), " "), lambda t: t != F.lit("")).alias("toks"),
    ).filter(F.size("toks") >= 3)
    tris = d.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 2),"
                " i -> concat_ws(' ', toks[i-1], toks[i], toks[i+1]))"
            )
        ).alias("tri"),
    )
    cnt = tris.groupBy("doc_id", "tri").agg(F.count(F.lit(1)).alias("c"))
    agg = cnt.groupBy("doc_id").agg(
        F.max("c").alias("max_tri"), F.sum("c").alias("n_tris")
    )
    ratio = F.col("max_tri").cast("double") / F.col("n_tris")
    return agg.select(
        "doc_id",
        "max_tri",
        "n_tris",
        ratio.alias("rep_ratio"),
        F.when(ratio > 0.2, 1).otherwise(0).alias("flagged"),
    )


@register(
    "l7_quality_topp",
    oracle="""
WITH scored AS (
  SELECT doc_id, lang,
         len(list_filter(string_split(text, ' '), t -> t != '')) AS n_tokens,
         0.4 * LEAST(len(list_filter(string_split(text,' '), t -> t != '')) / 100.0, 1.0)
         + 0.3 * (len(list_distinct(list_filter(string_split(text,' '), t -> t != '')))
                  / GREATEST(CAST(len(list_filter(string_split(text,' '), t -> t != '')) AS DOUBLE), 1.0))
         + 0.3 * (1.0 - len(list_filter(string_split(text,' '),
                                        t -> t IN ('the','a','of','and','to','in','is')))
                        / GREATEST(CAST(len(list_filter(string_split(text,' '), t -> t != '')) AS DOUBLE), 1.0))
           AS q
  FROM documents),
tot AS (SELECT lang, CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
        FROM scored GROUP BY lang),
ranked AS (
  SELECT s.doc_id, s.lang, s.n_tokens, t.total_tokens,
         SUM(s.n_tokens) OVER (PARTITION BY s.lang ORDER BY s.q DESC, s.doc_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - s.n_tokens AS cum_before
  FROM scored s JOIN tot t USING (lang))
SELECT lang, COUNT(*) AS n_kept,
       CAST(SUM(n_tokens) AS BIGINT) AS kept_tokens,
       MIN(total_tokens) AS total_tokens
FROM ranked
WHERE cum_before * 10 < total_tokens * 6
GROUP BY lang
""",
    tags=("L4", "W3"),
)
def l7_quality_topp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-budget (top-p) selection — data curation under a token
    budget: per language, take documents best-quality-first until 60% of
    that language's tokens are spent (a doc is kept if it STARTS inside
    the budget). Ranking uses the closed-form quality score: IEEE basic
    ops with the identical expression tree in both engines, so the order
    — and therefore the kept set — is bit-deterministic (the budget test
    is integer cross-multiplication; the output is integers only). One
    window cumsum per lang partition; at 100 TB lang is the shard key and
    the scan is one pass."""
    from pyspark.sql import Window

    d = T(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        "lang",
        F.size(tokens("text")).alias("n_tokens"),
        quality_score("text").alias("q"),
    )
    tot = scored.groupBy("lang").agg(F.sum("n_tokens").alias("total_tokens"))
    w = (
        Window.partitionBy("lang")
        .orderBy(F.desc("q"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ranked = (
        scored.join(F.broadcast(tot), "lang")
        .withColumn("cum_before", F.sum("n_tokens").over(w) - F.col("n_tokens"))
    )
    return (
        ranked.filter(F.col("cum_before") * 10 < F.col("total_tokens") * 6)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_tokens").alias("kept_tokens"),
            F.min("total_tokens").alias("total_tokens"),
        )
    )


@register(
    "l7_mixture_rebalance",
    oracle="""
WITH d AS (
  SELECT doc_id, lang, text,
         len(list_filter(string_split(text, ' '), t -> t != '')) AS n_tokens,
         (strpos('0123456789abcdef', substr(md5(text), 1, 1)) - 1) * 16
           + (strpos('0123456789abcdef', substr(md5(text), 2, 1)) - 1) AS h256
  FROM documents),
tot AS (SELECT lang, CAST(SUM(n_tokens) AS BIGINT) AS lang_tokens
        FROM d GROUP BY lang),
m AS (SELECT MIN(lang_tokens) AS min_tokens FROM tot),
thr AS (
  SELECT lang, lang_tokens, CAST((256 * min_tokens) // lang_tokens AS BIGINT) AS t256
  FROM tot, m)
SELECT d.lang, thr.t256,
       COUNT(*) FILTER (WHERE d.h256 < thr.t256) AS n_kept,
       CAST(SUM(d.n_tokens) FILTER (WHERE d.h256 < thr.t256) AS BIGINT) AS kept_tokens,
       MIN(thr.lang_tokens) AS lang_tokens
FROM d JOIN thr USING (lang)
GROUP BY d.lang, thr.t256
""",
    tags=("L4", "F1"),
)
def l7_mixture_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-mixture rebalancing — downsample every language toward the
    smallest language's token count with a DETERMINISTIC content-hash
    sampler: keep a doc iff its 256-level md5 bucket falls under the
    per-lang threshold t = floor(256·min_tokens/lang_tokens) (integer
    division end-to-end). Content-hash selection means the same doc makes
    the same cut on every rebuild and on any cluster layout — the
    reproducibility property RNG sampling lacks. One agg for the token
    histogram (broadcast back), one scan to select."""
    hexd = "0123456789abcdef"
    h256 = (
        (F.instr(F.lit(hexd), F.substring(F.md5(F.col("text").cast("binary")), 1, 1)) - 1) * 16
        + (F.instr(F.lit(hexd), F.substring(F.md5(F.col("text").cast("binary")), 2, 1)) - 1)
    )
    d = T(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.size(tokens("text")).alias("n_tokens"), h256.alias("h256")
    )
    tot = d.groupBy("lang").agg(F.sum("n_tokens").alias("lang_tokens"))
    min_tokens = tot.agg(F.min("lang_tokens").alias("m"))
    thr = tot.crossJoin(F.broadcast(min_tokens)).select(
        "lang",
        "lang_tokens",
        F.expr("(256 * m) div lang_tokens").cast("long").alias("t256"),
    )
    keep = F.col("h256") < F.col("t256")
    return (
        d.join(F.broadcast(thr), "lang")
        .groupBy("lang", "t256")
        .agg(
            F.sum(F.when(keep, 1).otherwise(0)).alias("n_kept"),
            F.sum(F.when(keep, F.col("n_tokens"))).alias("kept_tokens"),
            F.min("lang_tokens").alias("lang_tokens"),
        )
    )


@register(
    "l5_audio_features",
    # Like l5_image_thumbnail: the WAV encode→decode roundtrip is lossless
    # and the PCM16 samples are a fixed function of the text bytes (pairs,
    # little-endian), so DuckDB re-derives every feature as character
    # arithmetic — the audio codec path is hash-checked, not row-counted.
    oracle="""
WITH p AS (
  SELECT doc_id, substr(repeat(text, 33), 1, 256) AS pay FROM documents
  WHERE LENGTH(repeat(text, 33)) >= 256),
s AS (
  SELECT doc_id,
         [CASE WHEN ord(substr(pay, 2*i-1, 1)) + 256 * ord(substr(pay, 2*i, 1)) >= 32768
               THEN ord(substr(pay, 2*i-1, 1)) + 256 * ord(substr(pay, 2*i, 1)) - 65536
               ELSE ord(substr(pay, 2*i-1, 1)) + 256 * ord(substr(pay, 2*i, 1)) END
          for i in range(1, 129)] AS sm
  FROM p)
SELECT doc_id,
       CAST(128 AS BIGINT) AS n_samples,
       CAST(8 AS BIGINT) AS duration_ms,
       CAST(list_max([abs(x) for x in sm]) AS BIGINT) AS peak,
       CAST(list_sum([abs(x) for x in sm]) AS BIGINT) AS abs_sum
FROM s
""",
    tags=("L5", "U3"),
)
def l5_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5 audio: a REAL stdlib WAV pipeline — each document's bytes become
    128 little-endian PCM16 samples, an Arrow-batched stage wraps them in
    a RIFF/WAVE container (encode_wav), and a second mapInPandas stage
    parses the RIFF chunks back (decode_wav) and emits per-clip integer
    features (sample count, duration, peak, abs-sum). Together with the
    PNG pipeline this makes image AND audio bytes→payload→features real
    end-to-end; tests/test_png.py-style roundtrip pinning lives in
    tests/test_llm_ops.py."""
    from collections.abc import Iterator

    from pyspark.sql import types as T_

    from ..operators.multimodal import encode_wav, wav_features

    need = 256
    d = T(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(f"substring(encode(repeat(text, 33), 'UTF-8'), 1, {need})").alias("raw"),
    ).filter(F.octet_length("raw") == need)

    wav_schema = T_.StructType(
        [T_.StructField("doc_id", T_.LongType()), T_.StructField("payload", T_.BinaryType())]
    )

    def to_wav(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in it:
            payloads = [
                encode_wav(np.frombuffer(bytes(r), dtype="<i2"), sample_rate=16000)
                for r in pdf["raw"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    wavs = d.mapInPandas(to_wav, wav_schema)
    return wav_features(wavs)


@register(
    "l5_video_framesample",
    # Sampled frames 0 and 2 of the 4-frame 8x8 rgb8 stack are byte ranges
    # [0,192) and [384,576) of the tiled text — PNG framing is lossless, so
    # DuckDB re-derives the sampled-pixel sums as character arithmetic and
    # the container walk + keyframe sampling is hash-checked end-to-end.
    oracle="""
WITH p AS (
  SELECT doc_id, substr(repeat(text, 97), 1, 768) AS pay FROM documents
  WHERE LENGTH(repeat(text, 97)) >= 768)
SELECT doc_id,
       4 AS n_frames,
       2 AS n_sampled,
       CAST(list_sum([ord(substr(pay, i, 1)) for i in range(1, 193)])
          + list_sum([ord(substr(pay, i, 1)) for i in range(385, 577)]) AS BIGINT)
         AS sampled_px_sum,
       ord(substr(pay, 1, 1)) AS f0_first,
       ord(substr(pay, 385, 1)) AS f2_first
FROM p
""",
    tags=("L5", "U3"),
)
def l5_video_framesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5 video: motion-PNG container pipeline — each document's bytes
    become a 4-frame 8x8 rgb8 stack, every frame is PNG-encoded and the
    frames concatenated into one container payload (stage 1); stage 2
    walks the container chunk-by-chunk, decodes every 2nd frame
    (keyframe-style sampling — skipped frames are header-walked only, not
    unfiltered), and emits per-clip frame stats. With the PNG thumbnail
    and WAV features this makes image, audio, AND video bytes→features
    pipelines real and SQL-verified."""
    from collections.abc import Iterator

    from pyspark.sql import types as T_

    from ..operators.multimodal import encode_png, sample_frames

    w = h = 8
    frame_bytes = w * h * 3  # 192
    need = 4 * frame_bytes  # 768
    d = T(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(f"substring(encode(repeat(text, 97), 'UTF-8'), 1, {need})").alias("raw"),
    ).filter(F.octet_length("raw") == need)

    container_schema = T_.StructType(
        [T_.StructField("doc_id", T_.LongType()), T_.StructField("payload", T_.BinaryType())]
    )

    def to_container(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in it:
            payloads = []
            for raw in pdf["raw"]:
                stack = np.frombuffer(bytes(raw), dtype=np.uint8).reshape(4, h, w, 3)
                payloads.append(b"".join(encode_png(f) for f in stack))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    out_schema = T_.StructType(
        [
            T_.StructField("doc_id", T_.LongType()),
            T_.StructField("n_frames", T_.IntegerType()),
            T_.StructField("n_sampled", T_.IntegerType()),
            T_.StructField("sampled_px_sum", T_.LongType()),
            T_.StructField("f0_first", T_.IntegerType()),
            T_.StructField("f2_first", T_.IntegerType()),
        ]
    )

    def sample(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            out = {k: [] for k in ("doc_id", "n_frames", "n_sampled", "sampled_px_sum", "f0_first", "f2_first")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                frames = sample_frames(bytes(payload), every=2)
                out["doc_id"].append(doc_id)
                out["n_frames"].append(4)
                out["n_sampled"].append(len(frames))
                out["sampled_px_sum"].append(int(frames.astype("int64").sum()))
                out["f0_first"].append(int(frames[0, 0, 0, 0]))
                out["f2_first"].append(int(frames[1, 0, 0, 0]))
            yield pd.DataFrame(out)

    containers = d.mapInPandas(to_container, container_schema)
    return containers.mapInPandas(sample, out_schema)


_BPE_MERGES_CACHE: dict[str, list[tuple[str, str]]] = {}


@register(
    "l4_bpe_tokenize",
    oracle=None,  # iterative trainer (argmax per round) → rows-only; exact
    # merge-sequence + token-count parity vs the classic in-memory BPE is
    # pinned by tests/test_llm_ops.py::test_bpe_train_matches_reference
    tags=("L4", "F6"),
)
def l4_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenizer training + encoding (operators/bpe.py):
    learn 12 merges from the corpus's word-frequency table (each round =
    one vocabulary-sized DataFrame job: JVM pair-zip counts, one-row
    argmax collect, columnar greedy merge fold), then replay the merges
    over every document and count tokens. The training table is
    vocabulary-sized regardless of corpus size — the property that makes
    BPE training feasible at 100 TB; the encode pass is pure columnar
    folds, no UDF. Exact parity with the in-memory reference algorithm is
    unit-pinned."""
    from ..operators.bpe import bpe_encode_counts, bpe_train

    d = T(spark, sf_dir, "documents").select("doc_id", "text")
    merges = _BPE_MERGES_CACHE.get(sf_dir)
    if merges is None:
        merges = bpe_train(d, "text", n_merges=12)
        _BPE_MERGES_CACHE[sf_dir] = merges  # train once per corpus, like the PQ/IVF caches
    enc = bpe_encode_counts(d, merges, "text", "doc_id")
    n_chars = F.length(F.regexp_replace(F.lower("text"), " ", ""))
    return (
        enc.join(d, "doc_id")
        .select("doc_id", n_chars.alias("n_chars"), "n_bpe_tokens")
        .withColumn("compression", F.col("n_chars") / F.col("n_bpe_tokens"))
    )


@register(
    "l2_dedup_keep_best",
    oracle="""
WITH RECURSIVE tok AS MATERIALIZED (
  SELECT doc_id, unnest(list_distinct(list_filter(string_split(text, ' '), t -> t != ''))) AS w
  FROM documents WHERE doc_id < 1000
),
sizes AS MATERIALIZED (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY 1),
common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
  FROM tok a JOIN tok b ON a.w = b.w AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS MATERIALIZED (
  SELECT id_a, id_b FROM common
  JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
  WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.9
),
edges_sym AS MATERIALIZED (SELECT id_a AS n, id_b AS m FROM pairs UNION ALL SELECT id_b, id_a FROM pairs),
nodes AS MATERIALIZED (SELECT DISTINCT doc_id FROM documents WHERE doc_id < 1000),
reach AS (
  SELECT doc_id AS node, doc_id AS lbl FROM nodes
  UNION
  SELECT e.m AS node, r.lbl FROM reach r JOIN edges_sym e ON r.node = e.n
),
comp AS (SELECT node AS doc_id, MIN(lbl) AS component FROM reach GROUP BY 1),
scored AS (
  SELECT d.doc_id, c.component,
         0.4 * LEAST(len(list_filter(string_split(text,' '), t -> t != '')) / 100.0, 1.0)
         + 0.3 * (len(list_distinct(list_filter(string_split(text,' '), t -> t != '')))
                  / GREATEST(CAST(len(list_filter(string_split(text,' '), t -> t != '')) AS DOUBLE), 1.0))
         + 0.3 * (1.0 - len(list_filter(string_split(text,' '),
                                        t -> t IN ('the','a','of','and','to','in','is')))
                        / GREATEST(CAST(len(list_filter(string_split(text,' '), t -> t != '')) AS DOUBLE), 1.0))
           AS q
  FROM documents d JOIN comp c USING (doc_id) WHERE d.doc_id < 1000),
ranked AS (
  SELECT component, doc_id, q,
         ROW_NUMBER() OVER (PARTITION BY component ORDER BY q DESC, doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY component) AS n_docs
  FROM scored)
SELECT component, doc_id AS keep_id, CAST(n_docs AS BIGINT) AS n_docs
FROM ranked WHERE rn = 1
""",
    tags=("L2", "L1", "L4"),
)
def l2_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup dedup with the KEEP-BEST survivor policy — what real
    curation runs instead of keep-min-id: cluster near-duplicates
    (candidates-first LSH → Jaccard verify → connected components), then
    keep the highest-QUALITY document per cluster (doc_id tiebreak).
    Quality ranking reuses the IEEE-deterministic closed-form score, so
    the survivor choice is bit-stable and the full policy — clustering
    AND survivor selection — hash-checks against the recursive-CTE +
    window oracle."""
    from pyspark.sql import Window

    from ..operators.graph import connected_components

    d = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    # persist (r15): the band self-join reads sig on both sides — without
    # it the whole signature pipeline runs twice (see l2_minhash_lsh_
    # neardup, including why persist rather than localCheckpoint: the
    # cached relation keeps size stats for the join-strategy choice).
    sig = minhash_signature(
        d.select("doc_id", "text"), "text", k=64, w=1, id_cols=["doc_id"]
    ).persist()
    cands = lsh_candidate_pairs(sig, "doc_id", bands=16, rows=4)
    edges = jaccard_pairs(d, "doc_id", "text", w=1, threshold=0.9, candidates=cands)
    comp = connected_components(
        d.select("doc_id"), edges, id_col="doc_id", src="id_a", dst="id_b"
    )
    scored = d.select("doc_id", quality_score("text").alias("q")).join(comp, "doc_id")
    w = Window.partitionBy("component").orderBy(F.desc("q"), F.asc("doc_id"))
    wc = Window.partitionBy("component")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .withColumn("n_docs", F.count(F.lit(1)).over(wc).cast("long"))
        .filter(F.col("rn") == 1)
        .select("component", F.col("doc_id").alias("keep_id"), "n_docs")
    )


@register(
    "l7_eval_sample",
    oracle="""
WITH ranked AS (
  SELECT lang, doc_id,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY md5(text), doc_id) AS rk
  FROM documents)
SELECT lang, doc_id, CAST(rk AS BIGINT) AS rk
FROM ranked WHERE rk <= 20
""",
    tags=("L4", "W1"),
)
def l7_eval_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-k-per-stratum eval-set sampling: 20 documents per language,
    selected by ranking on the md5 of the CONTENT (doc_id tiebreak) — a
    deterministic pseudo-random draw that is reproducible across
    rebuilds, reshufflings, and engines (both sides rank the same hex
    strings), unlike RNG sampling. The complement of l7_mixture_rebalance
    (fractional thresholds): this one guarantees exact per-stratum
    counts, the shape eval-set construction needs."""
    from pyspark.sql import Window

    d = T(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.md5(F.col("text").cast("binary")).alias("h")
    )
    w = Window.partitionBy("lang").orderBy(F.asc("h"), F.asc("doc_id"))
    return (
        d.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 20)
        .select("lang", "doc_id", "rk")
    )


@register(
    "l2_weighted_jaccard",
    oracle="""
WITH d AS (
  SELECT doc_id, unnest(list_distinct(list_filter(string_split(text, ' '), t -> t != ''))) AS w
  FROM documents WHERE doc_id < 300),
n AS (SELECT COUNT(DISTINCT doc_id) AS nd FROM d),
idf AS (
  SELECT w, CAST(ln(CAST(nd AS DOUBLE) / COUNT(DISTINCT doc_id)) AS DECIMAL(18,9)) AS iw
  FROM d, n GROUP BY w, nd),
doc_w AS (
  SELECT doc_id, SUM(iw) AS s FROM d JOIN idf USING (w) GROUP BY doc_id),
shared AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, SUM(idf.iw) AS inter_w
  FROM d a JOIN d b ON a.w = b.w AND a.doc_id < b.doc_id
  JOIN idf ON idf.w = a.w
  GROUP BY 1, 2),
scored AS (
  SELECT id_a, id_b,
         CAST(inter_w AS DOUBLE) / CAST(sa.s + sb.s - inter_w AS DOUBLE) AS wj
  FROM shared
  JOIN doc_w sa ON sa.doc_id = id_a
  JOIN doc_w sb ON sb.doc_id = id_b)
SELECT id_a, id_b, wj FROM scored WHERE wj >= 0.9
""",
    tags=("L2", "L4"),
)
def l2_weighted_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IDF-WEIGHTED Jaccard near-dup — rare-token overlap counts more
    than boilerplate overlap (two docs sharing template words are not
    near-dups; two sharing a rare passage are): wj = Σ_{A∩B} idf /
    (Σ_A + Σ_B − Σ_{A∩B}). idf values are quantized to DECIMAL(18,9)
    before summation so the reductions are exact and order-independent
    in both engines — the final ratio is a deterministic double. Exact
    all-pairs on a deterministic 300-doc slice (the scale path pairs
    this scorer with MinHash-LSH candidates, like `jaccard_pairs`)."""
    d = (
        T(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 300)
        .select("doc_id", F.explode(F.array_distinct(tokens("text"))).alias("w"))
    )
    nd = d.select("doc_id").distinct().count()
    idf = d.groupBy("w").agg(
        F.log(F.lit(float(nd)) / F.count_distinct("doc_id"))
        .cast("decimal(18,9)")
        .alias("iw")
    )
    dw = d.join(idf, "w")
    doc_w = dw.groupBy("doc_id").agg(F.sum("iw").alias("s"))
    a = dw.select(F.col("doc_id").alias("id_a"), "w", "iw")
    b = dw.select(F.col("doc_id").alias("id_b"), "w")
    shared = (
        a.join(b, (a["w"] == b["w"]) & (F.col("id_a") < F.col("id_b")))
        .groupBy("id_a", "id_b")
        .agg(F.sum("iw").alias("inter_w"))
    )
    sa = doc_w.select(F.col("doc_id").alias("id_a"), F.col("s").alias("sa"))
    sb = doc_w.select(F.col("doc_id").alias("id_b"), F.col("s").alias("sb"))
    return (
        shared.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("inter_w").cast("double")
                / (F.col("sa") + F.col("sb") - F.col("inter_w")).cast("double")
            ).alias("wj"),
        )
        .filter(F.col("wj") >= 0.9)
    )


# ---------------------------------------------------------------- round 5:
# corpus-prep additions — boilerplate removal, RAG chunking, deterministic
# global shuffle, incremental near-dup, containment near-dup.


@register(
    "l4_boilerplate_removal",
    oracle="""
WITH tok AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t != '') AS toks
  FROM documents),
seg AS (
  SELECT doc_id,
         unnest(list_transform(range(greatest(CAST(ceil(len(toks) / 3.0) AS INT), 1)),
                i -> struct_pack(h := md5(array_to_string(toks[i*3+1:i*3+3], ' ')),
                                 l := len(toks[i*3+1:i*3+3])))) AS s
  FROM tok),
seg2 AS (SELECT doc_id, s.h AS h, s.l AS l FROM seg),
freq AS (SELECT h, COUNT(DISTINCT doc_id) AS nd FROM seg2 GROUP BY 1)
SELECT doc_id, COUNT(*) AS n_segs,
       COUNT(*) FILTER (WHERE nd >= 5) AS n_boiler,
       CAST(COALESCE(SUM(l) FILTER (WHERE nd < 5), 0) AS BIGINT) AS kept_tokens
FROM seg2 JOIN freq USING (h)
GROUP BY doc_id
""",
    tags=("L4", "L2"),
)
def l4_boilerplate_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/RefinedWeb-style boilerplate removal: split each doc into
    consecutive 3-token segments, hash each, and mark a segment as
    boilerplate when it recurs in ≥5 distinct documents (template text, not
    content). Per-doc manifest: segment count, boilerplate count, tokens
    kept after removal. Shape at 100 TB: segmenting is a narrow map
    (`sequence` + `slice`, no UDF); the recurrence count is ONE two-phase
    groupBy on the 16-byte hash; the join back is hash-partitioned on the
    same key, AQE-splittable on skewed template segments. The md5 segment
    hash is computed identically by DuckDB, so manifests are value-checked
    end to end."""
    from ..operators.parallelism import fan_out
    from ..operators.text import segments

    # r14 opt: fan_out — the single-split documents scan serialized both
    # segment explodes (freq branch + join branch) on one task (guide
    # §2.5 input skew; no-op once the scan is parallel).
    d = fan_out(T(spark, sf_dir, "documents"))
    seg = d.select("doc_id", F.explode(segments("text", 3)).alias("st")).select(
        "doc_id",
        F.md5(F.concat_ws(" ", "st").cast("binary")).alias("h"),
        F.size("st").alias("l"),
    )
    # r15: aggregate to (h, doc) FIRST — the r14 shape evaluated the whole
    # segment explode twice (freq branch + join-back branch, no exchange
    # reuse). One explode pass feeds a partial-aggregable (h, doc_id)
    # groupBy; nd (distinct docs per hash) is exactly the row count of
    # that frame per h, and the join back moves (h, doc)-level rows
    # instead of segment instances. Join stays AQE-splittable on hot
    # template hashes.
    g = seg.groupBy("h", "doc_id").agg(
        F.count(F.lit(1)).alias("c"), F.sum("l").alias("sl")
    )
    freq = g.groupBy("h").agg(F.count(F.lit(1)).alias("nd"))
    return (
        g.join(freq, "h")
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_segs"),
            F.sum(F.when(F.col("nd") >= 5, F.col("c")).otherwise(F.lit(0))).alias(
                "n_boiler"
            ),
            F.sum(F.when(F.col("nd") < 5, F.col("sl")).otherwise(F.lit(0)))
            .cast("long")
            .alias("kept_tokens"),
        )
    )


@register(
    "l7_chunking",
    oracle="""
WITH tok AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t != '') AS toks
  FROM documents),
ch AS (
  SELECT doc_id,
         unnest(list_transform(range(1 + greatest(0, CAST(ceil((len(toks) - 32) / 24.0) AS INT))),
                i -> struct_pack(idx := i,
                                 n := len(toks[i*24+1:i*24+32]),
                                 h := md5(array_to_string(toks[i*24+1:i*24+32], ' '))))) AS c
  FROM tok)
SELECT doc_id, CAST(c.idx AS BIGINT) AS chunk_idx,
       CAST(c.n AS BIGINT) AS chunk_tokens, c.h AS chunk_hash
FROM ch
""",
    tags=("L4", "F6"),
)
def l7_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG-style overlapping chunking: sliding 32-token windows at stride 24
    (8-token overlap), one output row per chunk with its token count and an
    md5 content hash — the manifest a retrieval indexer consumes. The window
    arithmetic (`sequence` + `slice`) is a narrow JVM map; chunk explosion
    multiplies rows ~n_tokens/stride with NO shuffle, so at 100 TB this
    pipelines straight into the downstream embed/index stage. Chunk count,
    coverage, and hashes are value-checked against identical DuckDB window
    arithmetic."""
    from ..operators.text import chunks

    d = T(spark, sf_dir, "documents")
    return d.select(
        "doc_id", F.posexplode(chunks("text", 32, 24)).alias("chunk_idx", "ct")
    ).select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.size("ct").cast("long").alias("chunk_tokens"),
        F.md5(F.concat_ws(" ", "ct").cast("binary")).alias("chunk_hash"),
    )


@register(
    "l7_corpus_shuffle",
    oracle="""
WITH h AS (
  SELECT doc_id, md5('s42:' || CAST(doc_id AS VARCHAR)) AS h FROM documents),
s AS (
  SELECT doc_id, h,
         (strpos('0123456789abcdef', substr(h, 1, 1)) - 1) % 8 AS shard
  FROM h)
SELECT doc_id, CAST(shard AS BIGINT) AS shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY h, doc_id) AS BIGINT)
         AS pos_in_shard
FROM s
""",
    tags=("L4", "W1"),
)
def l7_corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training-order shuffle: seed-keyed md5 of the
    doc id gives every document a pseudo-random rank; the first hash nibble
    (mod 8) assigns the output shard and a per-shard window assigns the
    read position. No RNG state — the order is a pure function of
    (seed, doc_id), so it is reproducible across reruns and cluster
    topologies, and resharding for a different epoch is just a new seed.
    Scale shape: NO global sort — shard assignment is a narrow map and each
    shard orders independently (one hash exchange, 8-way parallel sort),
    which is how a 100 TB corpus is laid out for data-parallel training
    readers."""
    from pyspark.sql import Window

    d = T(spark, sf_dir, "documents").select(
        "doc_id",
        F.md5(
            F.concat(F.lit("s42:"), F.col("doc_id").cast("string")).cast("binary")
        ).alias("h"),
    )
    s = d.withColumn(
        "shard", (F.conv(F.substring("h", 1, 1), 16, 10).cast("int") % 8).cast("long")
    )
    w = Window.partitionBy("shard").orderBy("h", "doc_id")
    return s.select(
        "doc_id", "shard", F.row_number().over(w).cast("long").alias("pos_in_shard")
    )


@register(
    "l2_incremental_neardup",
    oracle="""
WITH tok AS (
  SELECT doc_id, source, list_filter(string_split(text, ' '), t -> t != '') AS toks
  FROM documents WHERE doc_id < 5000),
sh AS (
  SELECT doc_id, source,
         unnest(list_distinct(list_transform(range(greatest(len(toks) - 2, 1)),
                i -> array_to_string(toks[i+1:i+3], ' ')))) AS s
  FROM tok),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
common AS (
  SELECT a.doc_id AS na, b.doc_id AS eb, COUNT(*) AS c
  FROM (SELECT * FROM sh WHERE source = 'src0') a
  JOIN (SELECT * FROM sh WHERE source <> 'src0') b ON a.s = b.s
  GROUP BY 1, 2),
pairs AS (
  SELECT na, eb, ROUND(c * 1.0 / (sa.n + sb.n - c), 6) AS j
  FROM common JOIN sizes sa ON sa.doc_id = na JOIN sizes sb ON sb.doc_id = eb
  WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.8),
best AS (
  SELECT na, eb AS best_match, j AS best_jaccard
  FROM (SELECT na, eb, j,
               ROW_NUMBER() OVER (PARTITION BY na ORDER BY j DESC, eb) AS rn
        FROM pairs)
  WHERE rn = 1),
cnt AS (SELECT na, COUNT(*) AS n_dups FROM pairs GROUP BY 1)
SELECT n.doc_id AS new_id,
       CAST(COALESCE(cnt.n_dups, 0) AS BIGINT) AS n_dups,
       best.best_match, best.best_jaccard
FROM (SELECT doc_id FROM documents WHERE source = 'src0' AND doc_id < 5000) n
LEFT JOIN cnt ON cnt.na = n.doc_id
LEFT JOIN best ON best.na = n.doc_id
""",
    tags=("L2",),
)
def l2_incremental_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dedup: an arriving batch (source src0) is checked
    against the EXISTING corpus for trigram-shingle Jaccard ≥ 0.8 — one row
    per new doc with its duplicate-partner count and best match. This
    SQL-checked query runs the exact bipartite verify on a bounded slice;
    the 100 TB path is `minhash.banded_signatures` persisted once as the
    corpus index + `probe_lsh_index` per batch (sign ONLY the new docs,
    equi-join probe into the banded index, exact verify on candidates) —
    recall equivalence of probe vs exact is pinned by
    tests/test_llm_ops.py::test_incremental_probe_matches_exact."""
    d = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 5000)
    new = d.filter(F.col("source") == "src0").select("doc_id", "text")
    corpus = d.filter(F.col("source") != "src0").select("doc_id", "text")
    pairs = bipartite_jaccard_pairs(new, corpus, "doc_id", w=3, threshold=0.8)
    pairs = pairs.withColumn("j", F.round("jaccard", 6))
    # r15: ONE aggregation instead of window(top-1) + groupBy(count) + two
    # joins — the old shape evaluated the whole bipartite shingle verify
    # TWICE (best branch + cnt branch, no exchange reuse). best = min over
    # (−j, corpus_id) structs ≡ ORDER BY j DESC, corpus_id ASC row 1 (j is
    # already 6-dp rounded; double negation is exact).
    agg = pairs.groupBy("new_id").agg(
        F.count(F.lit(1)).alias("n_dups"),
        F.min(F.struct((-F.col("j")).alias("nj"), F.col("corpus_id").alias("cid"))).alias(
            "b"
        ),
    )
    return (
        new.select(F.col("doc_id").alias("new_id"))
        .join(agg, "new_id", "left")
        .select(
            "new_id",
            F.coalesce("n_dups", F.lit(0)).cast("long").alias("n_dups"),
            F.col("b.cid").alias("best_match"),
            (-F.col("b.nj")).alias("best_jaccard"),
        )
    )


@register(
    "l2_containment_neardup",
    oracle="""
WITH tok AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t != '') AS toks
  FROM documents WHERE doc_id < 5000),
sh AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(range(greatest(len(toks) - 2, 1)),
                i -> array_to_string(toks[i+1:i+3], ' ')))) AS s
  FROM tok),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id <> b.doc_id
  GROUP BY 1, 2)
SELECT id_a, id_b, ROUND(c * 1.0 / sa.n, 6) AS containment
FROM common JOIN sizes sa ON sa.doc_id = id_a
WHERE c * 1.0 / sa.n >= 0.6
""",
    tags=("L2",),
)
def l2_containment_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional containment near-dup: |shingles(A) ∩ shingles(B)| /
    |shingles(A)| ≥ 0.6 flags docs whose content is (mostly) embedded in
    another — quotes, supersets, wrapper pages — which symmetric Jaccard
    misses when the container is much longer. Exact shared-shingle join on
    a deterministic bounded slice; `containment_pairs` REFUSES unbounded
    exact runs (Jaccard-LSH candidates cannot guarantee containment
    recall — see its docstring for the scale-safe blocking contract)."""
    d = (
        T(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 5000)
        .select("doc_id", "text")
    )
    p = containment_pairs(d, "doc_id", w=3, threshold=0.6)
    return p.select("id_a", "id_b", F.round("containment", 6).alias("containment"))


@register(
    "l7_weighted_sample",
    oracle="""
WITH d AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split(text, ' '), t -> t != '')) AS BIGINT) AS n_tokens
  FROM documents),
tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS s FROM d),
keyed AS (
  SELECT doc_id, n_tokens,
         ('0x' || substr(md5('ws:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS v
  FROM d)
SELECT doc_id, n_tokens,
       ROUND(LEAST(50.0 * n_tokens / s, 1.0), 6) AS p_include
FROM keyed, tot
WHERE (2 * v + 1)::HUGEINT * s < 50::HUGEINT * n_tokens * 8589934592
""",
    tags=("L4", "A1"),
)
def l7_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-weighted Bernoulli corpus sampling (expected k=50 docs,
    inclusion probability k·wᵢ/Σw — the Horvitz-Thompson design for
    token-budget-proportional subcorpora). Randomness is a pure function
    of the doc id (first 8 md5 nibbles → 32-bit uniform), so the sample
    is REPRODUCIBLE and rebuild-stable, and the inclusion test is spelled
    in pure integer arithmetic ((2v+1)·Σw < k·w·2³³) — no float/libm
    divergence between engines, no RNG state to coordinate across 1000
    executors. One narrow scan + a broadcast 1-row total; the filter
    prunes at scan speed. The products are evaluated in exact wide
    decimals (decimal(38,0) / HUGEINT) because at 100 TB token totals
    (Σw ≈ 2⁴⁴) the int64 product (2v+1)·Σw ≈ 2⁷⁷ would overflow —
    decimal38 holds it with ~60 bits to spare, and only the comparison
    is wide (output columns stay BIGINT/DOUBLE for the gate hasher)."""
    d = T(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.filter(F.split("text", " "), lambda t: t != F.lit(""))).cast("long").alias("n_tokens"),
    )
    tot = d.agg(F.sum("n_tokens").cast("long").alias("s"))
    keyed = d.withColumn(
        "v",
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("ws:"), F.col("doc_id").cast("string")).cast("binary")),
                1,
                8,
            ),
            16,
            10,
        ).cast("long"),
    )
    return (
        keyed.crossJoin(F.broadcast(tot))
        .filter(
            (2 * F.col("v") + 1).cast("decimal(38,0)") * F.col("s")
            < F.lit(50).cast("decimal(38,0)") * F.col("n_tokens") * F.lit(8589934592)
        )
        .select(
            "doc_id",
            "n_tokens",
            F.round(F.least(F.lit(50.0) * F.col("n_tokens") / F.col("s"), F.lit(1.0)), 6).alias(
                "p_include"
            ),
        )
    )


@register(
    "l7_length_batching",
    oracle="""
WITH d AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split(text, ' '), t -> t != '')) AS BIGINT) AS n_tokens
  FROM documents),
b AS (
  SELECT doc_id, n_tokens, n_tokens // 16 AS bucket,
         ROW_NUMBER() OVER (PARTITION BY n_tokens // 16 ORDER BY doc_id) AS rn
  FROM d)
SELECT bucket, (rn - 1) // 8 AS batch_id,
       COUNT(*) AS n_docs,
       MAX(n_tokens) AS max_tokens,
       CAST(COUNT(*) * MAX(n_tokens) - SUM(n_tokens) AS BIGINT) AS padding_waste
FROM (SELECT bucket, rn, n_tokens FROM b)
GROUP BY bucket, batch_id
""",
    tags=("L4", "W1"),
)
def l7_length_batching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed micro-batching: docs grouped into 16-token length
    buckets, then packed into batches of 8 by stable doc_id order — the
    standard padding-waste minimization for LLM training/inference (a
    batch pads every member to its max length; batching similar lengths
    makes the per-batch padding_waste column small). One hash exchange on
    the bucket key + a per-bucket window; batch manifests (doc count, max
    length, padding waste) are value-checked. At 100 TB buckets are the
    parallelism unit — no global sort, no skew (bucket population is
    bounded by the length distribution, AQE splits hot buckets)."""
    from pyspark.sql import Window

    d = T(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.filter(F.split("text", " "), lambda t: t != F.lit(""))).cast("long").alias("n_tokens"),
    )
    b = d.withColumn("bucket", F.floor(F.col("n_tokens") / 16)).withColumn(
        "rn", F.row_number().over(Window.partitionBy("bucket").orderBy("doc_id"))
    )
    return (
        b.withColumn("batch_id", F.floor((F.col("rn") - 1) / 8))
        .groupBy("bucket", "batch_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.max("n_tokens").alias("max_tokens"),
            (F.count(F.lit(1)) * F.max("n_tokens") - F.sum("n_tokens"))
            .cast("long")
            .alias("padding_waste"),
        )
    )


@register(
    "l5_phash_neardup",
    # The tile is byte-deterministic (first 257 bytes of repeat(text)), so
    # the oracle recomputes the SAME 64 dHash bits as character arithmetic
    # and does the exact all-pairs hamming join — while the Spark side goes
    # raw→PNG→decode→dHash→banded hamming. 8 bands over 64 bits catch every
    # pair at hamming ≤ 7 by pigeonhole, so the ≤6 result set is EXACT and
    # the two sides hash-match.
    oracle="""
WITH p AS (
  SELECT doc_id, substr(repeat(text, 33), 1, 257) AS pay FROM documents
  WHERE LENGTH(repeat(text, 33)) >= 257 AND doc_id < 2000),
bits AS (
  SELECT doc_id,
         [CASE WHEN ord(substr(pay, ((i//8)*2)*16 + (i%8) + 1, 1)) <
                    ord(substr(pay, ((i//8)*2)*16 + (i%8) + 2, 1))
               THEN 1 ELSE 0 END
          FOR i IN range(64)] AS b
  FROM p)
SELECT a.doc_id AS id_a, b2.doc_id AS id_b,
       CAST(list_sum([CASE WHEN a.b[i+1] <> b2.b[i+1] THEN 1 ELSE 0 END FOR i IN range(64)]) AS BIGINT) AS hamming
FROM bits a JOIN bits b2 ON a.doc_id < b2.doc_id
WHERE list_sum([CASE WHEN a.b[i+1] <> b2.b[i+1] THEN 1 ELSE 0 END FOR i IN range(64)]) <= 6
""",
    tags=("L5", "L2"),
)
def l5_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5×L2: PERCEPTUAL image dedup — each document's deterministic
    16×16 gray tile goes through the REAL stdlib PNG codec (encode →
    decode), a 64-bit difference hash (8 sampled rows × 8 horizontal
    gradients) is computed from the DECODED pixels, and near-duplicate
    images are found by banded hamming search (8×8-bit bands — exact for
    hamming ≤ 7 by pigeonhole, verified ≤ 6). This is the image-corpus
    dedup shape at 100 TB: hashing is an Arrow-batched kernel over binary
    payloads (O(corpus)), pairing is the same banded equi-join the text
    SimHash path uses — never an all-pairs image comparison. Bounded to a
    deterministic 2000-doc slice only because the ORACLE must do the
    quadratic exact join; the Spark side is the unbounded-scale path.
    Like the other l5 media oracles, the character-arithmetic mirror
    (ord/substr as pixel values) relies on documents.text being pure
    ASCII — pinned by tests/test_llm_ops.py::
    test_documents_text_ascii_invariant."""
    from ..operators.multimodal import dhash64_png, encode_gray_png

    d = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 2000)
    payloads = d.select(
        "doc_id",
        F.expr("substring(encode(repeat(text, 33), 'UTF-8'), 1, 257)").alias("payload"),
    ).filter(F.octet_length("payload") == 257)
    pngs = encode_gray_png(payloads, src_w=16, src_h=16)
    phashes = dhash64_png(pngs, w=16, h=16)
    return simhash_near_dup_pairs(
        phashes, id_col="doc_id", sh_col="phash", max_hamming=6, bands=8
    )


@register(
    "l6_rag_pipeline",
    oracle="""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 7),
scored AS (
  SELECT e.vec_id,
         CAST(unnest(e.embedding) AS DOUBLE) AS x,
         CAST(unnest((SELECT qv FROM q)) AS DOUBLE) AS y
  FROM embeddings e),
agg AS (
  SELECT vec_id, ROUND(SUM(x * y) / (SQRT(SUM(x * x)) * SQRT(SUM(y * y))), 6) AS cs
  FROM scored GROUP BY vec_id),
top AS (SELECT vec_id AS doc_id, cs FROM agg ORDER BY cs DESC, vec_id LIMIT 5),
tok AS (
  SELECT d.doc_id, cs, list_filter(string_split(text, ' '), t -> t != '') AS toks
  FROM documents d JOIN top USING (doc_id)),
ch AS (
  SELECT doc_id, cs,
         unnest(list_transform(range(1 + greatest(0, CAST(ceil((len(toks) - 32) / 24.0) AS INT))),
                i -> struct_pack(idx := i,
                                 sc := len(list_filter(toks[i*24+1:i*24+32],
                                                       t -> t IN ('table', 'scan', 'merge')))))) AS c
  FROM tok),
ranked AS (
  SELECT doc_id, cs, c.idx AS idx, c.sc AS sc,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY c.sc DESC, c.idx) AS rn,
         COUNT(*) OVER (PARTITION BY doc_id) AS nch
  FROM ch)
SELECT doc_id, cs AS cos_sim, CAST(nch AS BIGINT) AS n_chunks,
       CAST(idx AS BIGINT) AS best_chunk_idx, CAST(sc AS BIGINT) AS best_chunk_score
FROM ranked WHERE rn = 1
""",
    tags=("L3", "L4", "W1"),
)
def l6_rag_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed RETRIEVAL pipeline (hybrid RAG shape): (1) vector recall —
    exact top-5 docs by cosine to the vec_id=7 embedding (the production
    swap-in is the partition-pruned IVF probe, same contract); (2) fetch
    the hit docs and chunk them (32-token windows, stride 24); (3) lexical
    rerank — score each chunk by query-term hits ('table scan merge') and
    keep the best chunk per doc. One broadcast of the 5-row hit list, a
    narrow chunk explosion, one per-doc window: retrieve → chunk → rerank
    with no extra corpus scans. Top-k, chunk arithmetic, and rerank are
    all value-checked end to end."""
    from pyspark.sql import Window

    from ..operators.text import chunks

    e = T(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in e.filter(F.col("vec_id") == 7).select("embedding").head()[0]]
    top = topk_cosine(e, qvec, k=5, round_to=6).select(
        F.col("vec_id").alias("doc_id"), "cos_sim"
    )
    docs = T(spark, sf_dir, "documents").join(F.broadcast(top), "doc_id")
    ch = docs.select(
        "doc_id",
        "cos_sim",
        F.posexplode(chunks("text", 32, 24)).alias("idx", "ct"),
    ).withColumn(
        "sc",
        F.size(F.filter(F.col("ct"), lambda t: t.isin("table", "scan", "merge"))).cast(
            "long"
        ),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("sc").desc(), F.col("idx"))
    wc = Window.partitionBy("doc_id")
    return (
        ch.withColumn("rn", F.row_number().over(w))
        .withColumn("n_chunks", F.count(F.lit(1)).over(wc))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            "cos_sim",
            F.col("n_chunks").cast("long").alias("n_chunks"),
            F.col("idx").cast("long").alias("best_chunk_idx"),
            F.col("sc").alias("best_chunk_score"),
        )
    )


@register(
    "l7_dataset_card",
    oracle=f"""
WITH s AS (
  SELECT doc_id, lang, source, text,
         len(list_filter(string_split(text, ' '), t -> t != '')) AS n_tokens,
         {_CORPUS_Q_SQL} AS q
  FROM documents)
SELECT COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       COUNT(DISTINCT lang) AS n_langs,
       COUNT(DISTINCT source) AS n_sources,
       CAST(COUNT(*) - COUNT(DISTINCT text) AS BIGINT) AS exact_dup_docs,
       MIN(n_tokens) AS min_tokens,
       MAX(n_tokens) AS max_tokens,
       ROUND(CAST(SUM(CAST(n_tokens AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*), 4)
         AS mean_tokens,
       ROUND(CAST(SUM(CAST(q AS DECIMAL(25,8))) AS DOUBLE) / COUNT(*), 6)
         AS mean_quality
FROM s
""",
    tags=("L4", "A1", "A2"),
)
def l7_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset card: the one-row datasheet a corpus release ships — doc
    and token counts, language/source diversity, exact-duplicate count,
    token-length range/mean, mean quality. ONE scan, one agg: the
    distincts are two-phase (partial per-partition sets), the duplicate
    count piggybacks on COUNT DISTINCT over the text (at 100 TB swap the
    exact text-distinct for the md5 fingerprint — same answer, 16-byte
    shuffle rows — or the HLL sketch the engine also ships). Every number
    hash-checked, so the published card can't drift from the data."""
    from ..operators.text import quality_score, tokens

    d = T(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        "source",
        "text",
        F.size(tokens("text")).alias("n_tokens"),
        quality_score("text").alias("q"),
    )
    return d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.count_distinct("lang").alias("n_langs"),
        F.count_distinct("source").alias("n_sources"),
        (F.count(F.lit(1)) - F.count_distinct("text")).cast("long").alias("exact_dup_docs"),
        F.min("n_tokens").cast("long").alias("min_tokens"),
        F.max("n_tokens").cast("long").alias("max_tokens"),
        davg("n_tokens", scale=6, out_round=4).alias("mean_tokens"),
        davg("q", scale=8, out_round=6).alias("mean_quality"),
    )


@register(
    "l3_radius_search",
    oracle="""
WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings WHERE vec_id < 3),
scored AS (
  SELECT q.q_id, e.vec_id,
         CAST(unnest(e.embedding) AS DOUBLE) AS x,
         CAST(unnest(q.q_vec) AS DOUBLE) AS y
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id <> q.q_id),
agg AS (
  SELECT q_id, vec_id,
         ROUND(SUM(x*y) / (SQRT(SUM(x*x)) * SQRT(SUM(y*y))), 6) AS cos_sim
  FROM scored GROUP BY 1, 2)
SELECT q_id, vec_id, cos_sim FROM agg WHERE cos_sim >= 0.25
""",
    tags=("L3",),
)
def l3_radius_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3 radius (range) search: every corpus neighbor with cosine ≥ 0.25
    for each of 3 query vectors — the fixed-similarity companion to top-k
    (near-dup sweeps want "everything this close", not "the closest k").
    Broadcast query set, per-partition JVM scoring, and the threshold
    filter IS the reduction (no window, no heap): at 100 TB the scan
    emits only qualifying rows. Threshold applied to the 6-dp rounded
    score on BOTH engines so the boundary is bit-identical."""
    from ..operators.similarity import radius_search_join

    e = T(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    return radius_search_join(q, e, threshold=0.25, round_to=6)


@register(
    "l3_knn_classify",
    oracle="""
WITH q AS (SELECT vec_id AS q_id, label AS true_label, embedding AS q_vec
           FROM embeddings WHERE vec_id < 5),
scored AS (
  SELECT q.q_id, q.true_label, e.vec_id, e.label,
         CAST(unnest(e.embedding) AS DOUBLE) AS x,
         CAST(unnest(q.q_vec) AS DOUBLE) AS y
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id <> q.q_id),
agg AS (
  SELECT q_id, true_label, vec_id, label,
         ROUND(SUM(x*y) / (SQRT(SUM(x*x)) * SQRT(SUM(y*y))), 6) AS cs
  FROM scored GROUP BY 1, 2, 3, 4),
nn AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cs DESC, vec_id) AS rn
  FROM agg),
votes AS (
  SELECT q_id, true_label, label, COUNT(*) AS n_votes
  FROM nn WHERE rn <= 10 GROUP BY 1, 2, 3),
winner AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY n_votes DESC, label) AS vr
  FROM votes)
SELECT q_id, CAST(true_label AS BIGINT) AS true_label,
       CAST(label AS BIGINT) AS predicted_label, n_votes
FROM winner WHERE vr = 1
""",
    tags=("L3", "W1", "A1"),
)
def l3_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN classification over the embedding table's label column: each
    of 5 query vectors takes the majority label of its 10 exact nearest
    neighbors (ties → smaller label; self excluded). The evaluation shape
    behind every embedding-quality report: scoring is the broadcast
    similarity join (WindowGroupLimit keeps 10 before any shuffle), the
    vote is one tiny groupBy — swap the exact join for the IVF probe at
    corpus scale, the vote logic is unchanged. Neighbor sets, vote
    counts, and tie-breaks are value-checked end to end."""
    from pyspark.sql import Window

    from ..operators.similarity import topk_cosine_join

    e = T(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"),
        F.col("label").alias("true_label"),
        F.col("embedding").alias("q_vec"),
    )
    corpus = e.select("vec_id", "label", "embedding")
    nn = topk_cosine_join(
        q.select("q_id", "q_vec"), corpus.select("vec_id", "embedding"), k=11, round_to=6
    )
    # k=11 then drop self: the query vector is its own perfect neighbor
    nn = nn.filter(F.col("vec_id") != F.col("q_id"))
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    nn10 = nn.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 10)
    votes = (
        nn10.join(corpus.select("vec_id", "label"), "vec_id")
        .groupBy("q_id", "label")
        .agg(F.count(F.lit(1)).alias("n_votes"))
    )
    vw = Window.partitionBy("q_id").orderBy(F.desc("n_votes"), F.asc("label"))
    winner = votes.withColumn("vr", F.row_number().over(vw)).filter(F.col("vr") == 1)
    return (
        winner.join(q.select("q_id", "true_label"), "q_id")
        .select(
            "q_id",
            F.col("true_label").cast("long").alias("true_label"),
            F.col("label").cast("long").alias("predicted_label"),
            "n_votes",
        )
    )


@register(
    "l3_ivf_delete",
    oracle="""
WITH q AS (SELECT embedding AS q_vec FROM embeddings WHERE vec_id = 1),
scored AS (
  SELECT e.vec_id,
         CAST(unnest(e.embedding) AS DOUBLE) AS x,
         CAST(unnest(q.q_vec) AS DOUBLE) AS y
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id <> 1 AND e.vec_id % 7 <> 0),
agg AS (
  SELECT vec_id,
         ROUND(SUM(x*y) / (SQRT(SUM(x*x)) * SQRT(SUM(y*y))), 6) AS cos_sim
  FROM scored GROUP BY 1)
SELECT vec_id, cos_sim FROM agg ORDER BY cos_sim DESC, vec_id LIMIT 10
""",
    tags=("L3", "S7"),
)
def l3_ivf_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector UNLEARNING from a persisted IVF index (the GDPR path for a
    100 TB vector store): every vec_id % 7 == 0 is erased via an
    O(deleted) tombstone commit — the index's partitioned data files are
    never rewritten, and the assertion pins that — after which a probe
    over ALL clusters (nprobe = C, making IVF + rescore EXACT) returns
    the brute-force top-10 of the surviving corpus. Hash-equality against
    the DuckDB oracle (which excludes the ids arithmetically) proves a
    deleted vector can never surface from any probe. Erase cost is
    O(|erased|); compaction reclaims bytes offline."""
    import os
    import tempfile

    from ..operators.similarity import (
        build_ivf_index,
        delete_from_ivf_index,
        read_ivf_index,
        seeded_centroids,
        topk_cosine,
    )

    e = T(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cents = seeded_centroids(e, c=8)
    path = tempfile.mkdtemp(prefix="rdl_ivfdel_")
    build_ivf_index(e, cents, path)

    files_before = sorted(
        os.path.join(r, f) for r, _, fs in os.walk(path) for f in fs if f.endswith(".parquet")
    )
    delete_from_ivf_index(e.filter(F.col("vec_id") % 7 == 0), path)
    files_after = sorted(
        os.path.join(r, f)
        for r, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet") and "_tombstones" not in r
    )
    assert files_before == files_after, "delete rewrote index data files"

    qvec = [float(x) for x in e.filter(F.col("vec_id") == 1).head()["embedding"]]
    live = read_ivf_index(spark, path).filter(F.col("vec_id") != 1)
    return topk_cosine(live, qvec, k=10, round_to=6)


@register(
    "l7_epoch_reshard",
    oracle="""
WITH epochs AS (SELECT unnest(generate_series(0, 2)) AS epoch),
assigned AS (
  SELECT e.epoch, d.doc_id,
         CAST(('0x' || substr(md5('e' || e.epoch || ':' || d.doc_id), 1, 8)) AS BIGINT) AS h
  FROM documents d CROSS JOIN epochs e),
ranked AS (
  SELECT epoch, h % 8 AS shard, doc_id,
         ROW_NUMBER() OVER (PARTITION BY epoch, h % 8 ORDER BY h, doc_id) AS pos
  FROM assigned)
SELECT epoch, shard,
       COUNT(*) AS n_docs,
       CAST(SUM(doc_id) AS BIGINT) AS sum_doc_ids,
       CAST(SUM(doc_id * pos) AS BIGINT) AS order_fingerprint
FROM ranked GROUP BY epoch, shard
""",
    tags=("L7", "F1", "W1"),
)
def l7_epoch_reshard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L7 epoch resharding: every training epoch re-deals the corpus into
    8 shards with a DIFFERENT deterministic permutation — shard and
    within-shard order both derive from md5('e<epoch>:<doc_id>'), so any
    worker can recompute its shard list for any epoch with zero
    coordination and no stored shuffle state (the Pangu/Megatron
    epoch-seed pattern). Assignment is pure column math (no rand(), no
    global sort): at 100 TB each epoch is one hash projection + a write
    partitioned by shard, and the order_fingerprint column
    (sum(doc_id x within-shard-position)) pins the exact per-shard
    SEQUENCE, not just membership, against the oracle."""
    from pyspark.sql import Window

    epochs = spark.range(3).select(F.col("id").cast("int").alias("epoch"))
    d = T(spark, sf_dir, "documents").select("doc_id")
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("e"), F.col("epoch"), F.lit(":"), F.col("doc_id"))),
            1, 8,
        ),
        16, 10,
    ).cast("long")
    assigned = d.crossJoin(F.broadcast(epochs)).select(
        "epoch", "doc_id", h.alias("h")
    )
    w = Window.partitionBy("epoch", F.col("h") % 8).orderBy("h", "doc_id")
    ranked = assigned.select(
        "epoch", (F.col("h") % 8).alias("shard"), "doc_id",
        F.row_number().over(w).alias("pos"),
    )
    return ranked.groupBy("epoch", "shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("doc_id").cast("long").alias("sum_doc_ids"),
        F.sum(F.col("doc_id") * F.col("pos")).cast("long").alias("order_fingerprint"),
    )


@register(
    "l6_retrieval_eval",
    oracle="""
WITH q AS (SELECT vec_id AS q_id, label AS q_label, embedding AS q_vec
           FROM embeddings WHERE vec_id < 5),
scored AS (
  SELECT q.q_id, q.q_label, e.vec_id, e.label,
         CAST(unnest(e.embedding) AS DOUBLE) AS x,
         CAST(unnest(q.q_vec) AS DOUBLE) AS y
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id <> q.q_id),
agg AS (
  SELECT q_id, q_label, vec_id, label,
         ROUND(SUM(x*y) / (SQRT(SUM(x*x)) * SQRT(SUM(y*y))), 6) AS cs
  FROM scored GROUP BY 1, 2, 3, 4),
nn AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cs DESC, vec_id) AS rn
  FROM agg)
SELECT q_id, CAST(q_label AS BIGINT) AS q_label,
       CAST(COUNT(*) FILTER (WHERE label = q_label) AS BIGINT) AS n_relevant_at_10,
       CAST(COUNT(*) FILTER (WHERE label = q_label) * 1000 / 10 AS BIGINT)
         AS precision_fp3
FROM nn WHERE rn <= 10
GROUP BY q_id, q_label
""",
    tags=("L6", "L3", "A6"),
)
def l6_retrieval_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality EVALUATION — the measurement loop a production
    retrieval system runs before/after every index or embedding change:
    for each query vector, take the exact cosine top-10 and score
    precision@10 against label agreement (label = relevance proxy, the
    standard eval when no click data exists). One broadcast of the query
    set, per-partition JVM scoring, a WindowGroupLimit top-k per query,
    one conditional aggregate — the same plan at 5 queries or 50k. The
    precision column is emitted fixed-point so the gate hashes integers.
    Companion to l3_knn_classify (same kernel, different contract: this
    grades the RETRIEVER, that one labels the query)."""
    from pyspark.sql import Window

    from ..operators.similarity import cosine

    e = T(spark, sf_dir, "embeddings").select("vec_id", "label", "embedding")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"),
        F.col("label").alias("q_label"),
        F.col("embedding").alias("q_vec"),
    )
    scored = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "q_label",
            "vec_id",
            "label",
            F.round(cosine(F.col("embedding"), F.col("q_vec")), 6).alias("cs"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cs").desc(), F.col("vec_id"))
    top = scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 10)
    rel = F.sum(F.when(F.col("label") == F.col("q_label"), 1).otherwise(0))
    return top.groupBy("q_id", F.col("q_label").cast("long").alias("q_label")).agg(
        rel.cast("long").alias("n_relevant_at_10"),
        (rel * 1000 / 10).cast("long").alias("precision_fp3"),
    )


@register(
    "l2_semdedup",
    oracle="""
WITH RECURSIVE c AS (
  SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cvec
  FROM embeddings WHERE vec_id < 8),
asn AS MATERIALIZED (
  SELECT vec_id, embedding, cid FROM (
    SELECT e.vec_id, e.embedding, c.cid,
           ROW_NUMBER() OVER (
             PARTITION BY e.vec_id
             ORDER BY ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cvec), 8) DESC,
                      c.cid) AS rn
    FROM embeddings e CROSS JOIN c)
  WHERE rn = 1),
pairs AS MATERIALIZED (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM asn a JOIN asn b ON a.cid = b.cid AND a.vec_id < b.vec_id
  WHERE ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                     CAST(b.embedding AS DOUBLE[])), 6) >= 0.9),
edges_sym AS MATERIALIZED (
  SELECT id_a AS n, id_b AS m FROM pairs UNION ALL SELECT id_b, id_a FROM pairs),
nodes AS MATERIALIZED (SELECT vec_id FROM embeddings),
reach AS (
  SELECT vec_id AS node, vec_id AS lbl FROM nodes
  UNION
  SELECT e.m AS node, r.lbl FROM reach r JOIN edges_sym e ON r.node = e.n),
comp AS (SELECT node, MIN(lbl) AS component FROM reach GROUP BY 1)
SELECT component, COUNT(*) AS n_vecs FROM comp GROUP BY 1
""",
    tags=("L2", "L3", "L1"),
)
def l2_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023 — the embedding-space dedup standard
    for LLM corpora): cluster the embeddings (here the deterministic
    seeded centroids; production swaps in the k-means fit, same
    contract), compute pairwise cosine ONLY WITHIN each cluster, connect
    components at cos ≥ 0.9, keep the min-id survivor per component. The
    within-cluster restriction is the entire scale story: all-pairs is
    O(N²) but clustered pairs are O(N²/C) — at 100 TB you pick C ~ N/1k
    so each cluster's pair block fits one task, and the assignment is a
    broadcast join (never N×N). Components reuse operators/graph.py; the
    oracle recomputes assignment, pairs, and components exactly
    (DuckDB's list_cosine_similarity matches the JVM fold at 6 dp —
    thresholds compare ROUNDED values on both engines so the boundary is
    bit-identical). Returns per-component sizes (singletons included:
    the kept-set size is the component count)."""
    from ..operators.graph import connected_components
    from ..operators.similarity import cosine, ivf_assign, seeded_centroids

    e = T(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    asn = ivf_assign(e, seeded_centroids(e, c=8))
    a = asn.select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"), "centroid_id"
    )
    b = asn.select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"), "centroid_id"
    )
    pairs = (
        a.join(b, "centroid_id")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(F.round(cosine(F.col("va"), F.col("vb")), 6) >= 0.9)
        .select("id_a", "id_b")
    )
    comp = connected_components(
        e.select("vec_id"), pairs, id_col="vec_id", src="id_a", dst="id_b"
    )
    return comp.groupBy("component").agg(F.count(F.lit(1)).alias("n_vecs"))


@register(
    "l5_scene_cuts",
    # Frames are 192-byte windows of the tiled text, so DuckDB re-derives
    # every inter-frame pixel delta as character arithmetic — cuts are
    # integer comparisons, exact on both engines.
    oracle="""
WITH p AS (SELECT doc_id, substr(repeat(text, 193), 1, 1536) AS pay
           FROM documents WHERE LENGTH(repeat(text, 193)) >= 1536),
d AS (SELECT doc_id, i,
        list_sum([abs(ord(substr(pay, 192*(i-1)+j, 1)) - ord(substr(pay, 192*i+j, 1)))
                  FOR j IN generate_series(1, 192)]) AS delta
      FROM p, (SELECT unnest(generate_series(1, 7)) AS i) g)
SELECT doc_id,
       CAST(COUNT(*) FILTER (WHERE delta > 5400) AS BIGINT) AS n_cuts,
       COALESCE(string_agg(CASE WHEN delta > 5400 THEN CAST(i AS VARCHAR) END,
                           ',' ORDER BY i), '') AS cuts
FROM d GROUP BY doc_id
""",
    tags=("L5", "U3"),
)
def l5_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5 video scene segmentation: each clip (an 8-frame 8x8 rgb8 stack
    from the document's bytes) is scanned for scene cuts — frame i is a
    cut when the summed absolute pixel delta vs frame i-1 exceeds the
    threshold (operators/multimodal.py::scene_cuts, integer math
    end-to-end). The curation primitive that segments raw video into
    scenes before per-scene keyframe sampling/captioning; runs as an
    Arrow-batched mapInPandas kernel over binary payloads — the same
    batch shape a real decoder plugs into — and the oracle re-derives
    every delta as character arithmetic, so the cut list is hash-exact."""
    from collections.abc import Iterator

    from pyspark.sql import types as T_

    from ..operators.multimodal import scene_cuts

    w = h = 8
    need = 8 * w * h * 3  # 1536
    d = T(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(f"substring(encode(repeat(text, 193), 'UTF-8'), 1, {need})").alias("raw"),
    ).filter(F.octet_length("raw") == need)

    out_schema = T_.StructType(
        [
            T_.StructField("doc_id", T_.LongType()),
            T_.StructField("n_cuts", T_.LongType()),
            T_.StructField("cuts", T_.StringType()),
        ]
    )

    def detect(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            cuts = [scene_cuts(bytes(r), w, h, threshold=5400) for r in pdf["raw"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_cuts": [len(c) for c in cuts],
                    "cuts": [",".join(str(i) for i in c) for c in cuts],
                }
            )

    return d.mapInPandas(detect, out_schema)


# --- round 6 additions: exact duplicate spans + temperature sampling -------


@register(
    "l2_duplicate_spans",
    oracle="""
WITH tok AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t != '') AS t
  FROM documents),
w AS (
  SELECT doc_id, array_to_string(list_slice(t, i, i + 9), ' ') AS span
  FROM tok, UNNEST(range(1, GREATEST(len(t) - 9, 0) + 1)) AS u(i)),
c AS (SELECT span, COUNT(*) AS c FROM w GROUP BY span),
p AS (SELECT doc_id, COUNT(*) AS n_spans,
             SUM(CASE WHEN c.c >= 2 THEN 1 ELSE 0 END) AS n_dup
      FROM w JOIN c USING (span) GROUP BY doc_id)
SELECT d.doc_id,
       CAST(COALESCE(p.n_spans, 0) AS BIGINT) AS n_spans,
       CAST(COALESCE(p.n_dup, 0) AS BIGINT) AS n_dup_spans,
       CAST((10000 * COALESCE(p.n_dup, 0))
            // GREATEST(COALESCE(p.n_spans, 0), 1) AS BIGINT) AS dup_bp
FROM documents d LEFT JOIN p USING (doc_id)
""",
    tags=("L2", "L4"),
)
def l2_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate-SPAN detection (Lee et al. 2022): per document, how
    many of its sliding word 10-grams occur verbatim >= 2 times anywhere in
    the corpus — the sub-document complement to whole-doc L1/L2 dedup
    (boilerplate, quoted chains, templated passages survive doc-level dedup
    but still memorize). dup_bp = duplicated-position share in basis points,
    integer arithmetic end-to-end. See operators/dedup.py
    ``duplicate_span_stats`` for the 100 TB shape (hash the span key,
    stride the window)."""
    from ..operators.dedup import duplicate_span_stats

    d = T(spark, sf_dir, "documents")
    stats = duplicate_span_stats(d, "doc_id", "text", n=10)
    return stats.select(
        "doc_id",
        "n_spans",
        "n_dup_spans",
        F.expr(
            "CAST((10000 * n_dup_spans) DIV GREATEST(n_spans, 1) AS BIGINT)"
        ).alias("dup_bp"),
    )


@register(
    "l7_temperature_sampling",
    oracle="""
WITH per AS (
  SELECT source,
         CAST(SUM(len(list_filter(string_split(text, ' '), t -> t != '')))
              AS BIGINT) AS n_tokens
  FROM documents GROUP BY source),
r0 AS (SELECT source, n_tokens,
              CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT) AS r
       FROM per),
r1 AS (SELECT source, n_tokens,
              CASE WHEN (r + 1) * (r + 1) <= n_tokens THEN r + 1 ELSE r END AS r
       FROM r0),
s AS (SELECT source, n_tokens,
             CASE WHEN r * r > n_tokens THEN r - 1 ELSE r END AS s
      FROM r1),
tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS tot_tok,
               CAST(SUM(s) AS BIGINT) AS tot_s FROM s)
SELECT source, n_tokens,
       CAST((10000 * n_tokens) // tot_tok AS BIGINT) AS nat_bp,
       CAST((10000 * s) // tot_s AS BIGINT) AS temp_bp,
       CAST((100000 * s) // tot_s AS BIGINT) AS sampled_docs
FROM s, tot
""",
    tags=("L4", "A1"),
)
def l7_temperature_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based mixture sampling (mT5/XLM-R style): sample source i
    with probability proportional to p_i^alpha, alpha = 0.5, flattening the
    natural size distribution so small sources are seen more often. All
    arithmetic is INTEGER-exact cross-engine: p_i^0.5 is an exact integer
    sqrt (floor(sqrt) from the IEEE-correctly-rounded double sqrt, then a
    +/-1 integer correction), weights are basis-point integer division, and
    sampled_docs allocates a 100k-document budget. One corpus scan + one
    5-row aggregate; the totals broadcast back as a one-row cross join."""
    d = T(spark, sf_dir, "documents").select(
        "source", F.size(tokens("text")).alias("n")
    )
    from .helpers import isqrt_long

    per = d.groupBy("source").agg(F.sum("n").cast("long").alias("n_tokens"))
    per = per.select("source", "n_tokens", isqrt_long("n_tokens").alias("s"))
    tot = per.agg(
        F.sum("n_tokens").cast("long").alias("tot_tok"),
        F.sum("s").cast("long").alias("tot_s"),
    )
    return per.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_tokens",
        F.expr("CAST((10000 * n_tokens) DIV tot_tok AS BIGINT)").alias("nat_bp"),
        F.expr("CAST((10000 * s) DIV tot_s AS BIGINT)").alias("temp_bp"),
        F.expr("CAST((100000 * s) DIV tot_s AS BIGINT)").alias("sampled_docs"),
    )


@register(
    "l5_audio_vad",
    # Same losslessness argument as l5_audio_features: the WAV roundtrip
    # preserves the PCM16 samples, which are a fixed function of the text
    # bytes — so DuckDB re-derives frame energies, the active mask, and
    # the segment (run-start) count as pure character arithmetic, and the
    # hash checks the whole codec+VAD path.
    oracle="""
WITH p AS (
  SELECT doc_id, substr(repeat(text, 33), 1, 256) AS pay FROM documents
  WHERE LENGTH(repeat(text, 33)) >= 256),
s AS (
  SELECT doc_id,
         [abs(CASE WHEN ord(substr(pay, 2*i-1, 1)) + 256 * ord(substr(pay, 2*i, 1)) >= 32768
               THEN ord(substr(pay, 2*i-1, 1)) + 256 * ord(substr(pay, 2*i, 1)) - 65536
               ELSE ord(substr(pay, 2*i-1, 1)) + 256 * ord(substr(pay, 2*i, 1)) END)
          for i in range(1, 129)] AS a
  FROM p),
act AS (
  SELECT doc_id,
         [CASE WHEN list_sum(list_slice(a, 16*j+1, 16*j+16)) >= 390000
               THEN 1 ELSE 0 END for j in range(0, 8)] AS m
  FROM s)
SELECT doc_id,
       CAST(8 AS BIGINT) AS n_frames,
       CAST(list_sum(m) AS BIGINT) AS n_active,
       CAST(m[1] + list_sum([CASE WHEN m[j] = 1 AND m[j-1] = 0 THEN 1 ELSE 0 END
                             for j in range(2, 9)]) AS BIGINT) AS n_segments,
       CAST((10000 * list_sum(m)) // 8 AS BIGINT) AS speech_bp
FROM act
""",
    tags=("L5", "U3"),
)
def l5_audio_vad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5 audio VAD: encode each document's bytes as a PCM16 WAV clip
    (real RIFF container), then run energy voice-activity detection over
    16-sample frames — active-frame count, speech ratio in basis points,
    and SEGMENT count (maximal active runs: the speech-burst structure a
    silence trimmer or diarization pass consumes). Both stages are
    Arrow-batched mapInPandas over binary columns — the multimodal scale
    shape — and every output is integer-exact."""
    from collections.abc import Iterator

    from pyspark.sql import types as T_

    from ..operators.multimodal import encode_wav, vad_stats

    need = 256
    d = T(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(f"substring(encode(repeat(text, 33), 'UTF-8'), 1, {need})").alias("raw"),
    ).filter(F.octet_length("raw") == need)

    wav_schema = T_.StructType(
        [T_.StructField("doc_id", T_.LongType()), T_.StructField("payload", T_.BinaryType())]
    )

    def to_wav(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in it:
            payloads = [
                encode_wav(np.frombuffer(bytes(r), dtype="<i2"), sample_rate=16000)
                for r in pdf["raw"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    wavs = d.mapInPandas(to_wav, wav_schema)
    return vad_stats(wavs, frame=16, threshold=390_000).select(
        "doc_id",
        "n_frames",
        "n_active",
        "n_segments",
        F.expr("CAST((10000 * n_active) DIV n_frames AS BIGINT)").alias("speech_bp"),
    )


@register(
    "l4_quality_classifier",
    # The 256-bucket weight table is generated from the same closed-form
    # both engines can compute (multiplicative-hash weights in [-8, 7]),
    # so the score is integer-exact end-to-end. In production the weights
    # come from training — the PLUMBING under grade (hash buckets,
    # broadcast model join, per-doc integer fold) is identical either way.
    oracle="""
WITH w AS (
  SELECT range AS b, CAST((range * 2654435761) % 16 - 8 AS BIGINT) AS wt
  FROM range(0, 256)),
tok AS (
  SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t != '')) AS tk
  FROM documents),
tb AS (
  SELECT doc_id,
         (strpos('0123456789abcdef', substr(md5(tk), 1, 1)) - 1) * 16
           + (strpos('0123456789abcdef', substr(md5(tk), 2, 1)) - 1) AS b
  FROM tok)
SELECT doc_id, COUNT(*) AS n_tokens,
       CAST(SUM(wt) AS BIGINT) AS score,
       CAST(CASE WHEN SUM(wt) >= 0 THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM tb JOIN w USING (b)
GROUP BY doc_id
""",
    tags=("L4", "J2"),
)
def l4_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText/DCLM-style linear quality classifier as a SCALE shape:
    tokens hash into 256 feature buckets (md5 bucket — the hashing trick),
    the model is a 256-row weight TABLE broadcast to every executor (the
    way a trained classifier ships to a 1000-executor scoring pass), and
    each document's score is an integer sum over its token-bucket weights
    — one scan, one broadcast hash join, one two-phase aggregate; no UDF.
    keep = (score >= 0) is the classifier gate a curation pipeline feeds
    into its survivor filter."""
    from .helpers import hash_weights256, md5_bucket256

    weights = hash_weights256(spark)
    tok = T(spark, sf_dir, "documents").select(
        "doc_id", F.explode(tokens("text")).alias("tk")
    )
    tb = tok.select("doc_id", md5_bucket256("tk").alias("b"))
    return (
        tb.join(F.broadcast(weights), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("wt").cast("long").alias("score"),
        )
        .select(
            "doc_id", "n_tokens", "score",
            (F.col("score") >= 0).cast("long").alias("keep"),
        )
    )


@register(
    "l7_stratified_sample",
    oracle="""
SELECT doc_id, source, rk
FROM (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY md5(text), doc_id) AS rk
  FROM documents) t
WHERE rk <= 20
""",
    tags=("L4", "W1"),
)
def l7_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified EXACT-k sampling without an RNG: within each source,
    rank documents by content hash (md5 of the text) and keep the first
    k=20 — a reproducible "random" sample (md5 order is uniform in
    content, stable across reruns, clusters, and partition layouts, and
    changes only if the content changes). The complement of Bernoulli
    `l7_weighted_sample`: eval sets and ablation slices need exactly-k
    per stratum, not k-in-expectation. One shuffle (the per-source
    window); at 100 TB the window is a WindowGroupLimit (rank<=k pushes
    the limit below the sort) — no stratum ever materializes fully
    sorted."""
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy(F.md5(F.col("text").cast("binary")), F.col("doc_id"))
    return (
        T(spark, sf_dir, "documents")
        .select("doc_id", "source", "text")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 20)
        .select("doc_id", "source", F.col("rk").cast("long").alias("rk"))
    )


@register(
    "l3_mmr_diversify",
    # Greedy argmax chains are deterministic because every comparison is
    # over fixed-point BIGINT scores (cosines rounded to 1e-6 before any
    # ordering), with vec_id as the total-order tie-break — the oracle
    # unrolls the same five steps relationally.
    oracle="""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
sc AS (
  SELECT e.vec_id,
         CAST(unnest(e.embedding) AS DOUBLE) AS x,
         CAST(unnest((SELECT qv FROM q)) AS DOUBLE) AS y
  FROM embeddings e),
rel AS (
  SELECT vec_id,
         CAST(ROUND(1000000 * SUM(x*y) / (SQRT(SUM(x*x)) * SQRT(SUM(y*y)))) AS BIGINT) AS r
  FROM sc GROUP BY vec_id),
pool AS (SELECT vec_id, r FROM rel ORDER BY r DESC, vec_id LIMIT 20),
pe AS (SELECT p.vec_id, p.r, e.embedding FROM pool p JOIN embeddings e USING (vec_id)),
pp AS (
  SELECT a.vec_id AS i, b.vec_id AS j,
         CAST(unnest(a.embedding) AS DOUBLE) AS xa,
         CAST(unnest(b.embedding) AS DOUBLE) AS xb
  FROM pe a CROSS JOIN pe b WHERE a.vec_id < b.vec_id),
sim AS (
  SELECT i, j,
         CAST(ROUND(1000000 * SUM(xa*xb) / (SQRT(SUM(xa*xa)) * SQRT(SUM(xb*xb)))) AS BIGINT) AS s
  FROM pp GROUP BY i, j),
simb AS (SELECT i, j, s FROM sim UNION ALL SELECT j AS i, i AS j, s FROM sim),
s1 AS (SELECT vec_id, r FROM pool ORDER BY r DESC, vec_id LIMIT 1),
sel1 AS (SELECT vec_id FROM s1),
c2 AS (
  SELECT p.vec_id, p.r, MAX(sb.s) AS ms
  FROM pool p JOIN simb sb ON sb.i = p.vec_id JOIN sel1 ON sb.j = sel1.vec_id
  WHERE p.vec_id NOT IN (SELECT vec_id FROM sel1)
  GROUP BY p.vec_id, p.r),
s2 AS (SELECT vec_id, r FROM c2 ORDER BY 7*r - 3*ms DESC, vec_id LIMIT 1),
sel2 AS (SELECT vec_id FROM sel1 UNION ALL SELECT vec_id FROM s2),
c3 AS (
  SELECT p.vec_id, p.r, MAX(sb.s) AS ms
  FROM pool p JOIN simb sb ON sb.i = p.vec_id JOIN sel2 ON sb.j = sel2.vec_id
  WHERE p.vec_id NOT IN (SELECT vec_id FROM sel2)
  GROUP BY p.vec_id, p.r),
s3 AS (SELECT vec_id, r FROM c3 ORDER BY 7*r - 3*ms DESC, vec_id LIMIT 1),
sel3 AS (SELECT vec_id FROM sel2 UNION ALL SELECT vec_id FROM s3),
c4 AS (
  SELECT p.vec_id, p.r, MAX(sb.s) AS ms
  FROM pool p JOIN simb sb ON sb.i = p.vec_id JOIN sel3 ON sb.j = sel3.vec_id
  WHERE p.vec_id NOT IN (SELECT vec_id FROM sel3)
  GROUP BY p.vec_id, p.r),
s4 AS (SELECT vec_id, r FROM c4 ORDER BY 7*r - 3*ms DESC, vec_id LIMIT 1),
sel4 AS (SELECT vec_id FROM sel3 UNION ALL SELECT vec_id FROM s4),
c5 AS (
  SELECT p.vec_id, p.r, MAX(sb.s) AS ms
  FROM pool p JOIN simb sb ON sb.i = p.vec_id JOIN sel4 ON sb.j = sel4.vec_id
  WHERE p.vec_id NOT IN (SELECT vec_id FROM sel4)
  GROUP BY p.vec_id, p.r),
s5 AS (SELECT vec_id, r FROM c5 ORDER BY 7*r - 3*ms DESC, vec_id LIMIT 1)
SELECT CAST(1 AS BIGINT) AS rank, vec_id, r AS rel_fp FROM s1
UNION ALL SELECT 2, vec_id, r FROM s2
UNION ALL SELECT 3, vec_id, r FROM s3
UNION ALL SELECT 4, vec_id, r FROM s4
UNION ALL SELECT 5, vec_id, r FROM s5
""",
    tags=("L3", "W6"),
)
def l3_mmr_diversify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998):
    from the top-20 cosine candidates, greedily pick 5 maximizing
    lambda*rel − (1−lambda)*max-sim-to-selected (lambda = 0.7, as the
    integer score 7*rel_fp − 3*maxsim_fp over 1e-6 fixed-point cosines) —
    the diversity re-rank between ANN recall and answer assembly in a RAG
    stack. Scale shape: the CORPUS-side work is the distributed top-k
    scan; the greedy loop runs driver-side over the bounded pool (20
    candidates, 190 pairwise sims — metadata-sized by construction, like
    the union-find edge sets in graph.py), and the pairwise sims
    themselves are computed by the JVM cosine kernel before the one
    bounded collect."""
    from ..operators.similarity import cosine

    e = T(spark, sf_dir, "embeddings")
    qvec = e.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    q = F.lit([float(x) for x in qvec])
    rel_fp = F.round(F.lit(1000000.0) * cosine(F.col("embedding"), q)).cast("long")
    pool = (
        e.select("vec_id", rel_fp.alias("r"), "embedding")
        .orderBy(F.desc("r"), F.asc("vec_id"))
        .limit(20)
    )
    a = pool.select(F.col("vec_id").alias("i"), F.col("embedding").alias("va"))
    b = pool.select(F.col("vec_id").alias("j"), F.col("embedding").alias("vb"))
    sim_fp = F.round(F.lit(1000000.0) * cosine(F.col("va"), F.col("vb"))).cast("long")
    pairs = (
        a.join(F.broadcast(b), F.col("i") < F.col("j"))
        .select("i", "j", sim_fp.alias("s"))
    )

    rel = {row["vec_id"]: row["r"] for row in pool.select("vec_id", "r").collect()}
    sims: dict[tuple[int, int], int] = {}
    for row in pairs.collect():
        sims[(row["i"], row["j"])] = row["s"]
        sims[(row["j"], row["i"])] = row["s"]

    from ..operators.similarity import mmr_select

    selected = mmr_select(rel, sims, k=5, lam_num=7, lam_den=10)

    return spark.createDataFrame(
        [(i + 1, v, rel[v]) for i, v in enumerate(selected)],
        "rank long, vec_id long, rel_fp long",
    )


@register(
    "l5_image_augment",
    # Closed-form positions (1-based, R channel of an 8x8 rgb8 tile):
    # flip(0,c) = in(0, 7-c) -> byte (7-c)*3+1; rot90cw(0,c) = in(7-c, 0)
    # -> byte ((7-c)*8)*3+1. The weighted sums are ORDER-sensitive, so a
    # wrong permutation (flip vs rot, off-by-one, channel mixup) breaks
    # the hash — the augmentation kernels are value-checked, not assumed.
    oracle="""
WITH p AS (
  SELECT doc_id, substr(repeat(text, 25), 1, 192) AS pay FROM documents
  WHERE LENGTH(repeat(text, 25)) >= 192)
SELECT doc_id,
       CAST(ord(substr(pay, 22, 1)) AS BIGINT) AS fl_tl,
       CAST(list_sum([(c + 1) * ord(substr(pay, (7 - c) * 3 + 1, 1))
                      for c in range(0, 8)]) AS BIGINT) AS fl_w,
       CAST(ord(substr(pay, 169, 1)) AS BIGINT) AS rot_tl,
       CAST(list_sum([(c + 1) * ord(substr(pay, (7 - c) * 8 * 3 + 1, 1))
                      for c in range(0, 8)]) AS BIGINT) AS rot_w
FROM p
""",
    tags=("L5", "U3"),
)
def l5_image_augment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5 image augmentation: each document's bytes tile an 8x8 rgb8
    image; an Arrow-batched stage applies the two canonical vision-corpus
    augmentations (horizontal flip, 90° rotation) as REAL numpy kernels
    and emits order-sensitive integer checksums of the results. The
    oracle re-derives the same checksums as character arithmetic at the
    closed-form source positions — so the hash proves the permutations
    are exactly right, completing the L5 set (decode, features, resize,
    phash, scene cuts, VAD, augment)."""
    from ..operators.multimodal import augment_stats

    need = 8 * 8 * 3
    d = T(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(f"substring(encode(repeat(text, 25), 'UTF-8'), 1, {need})").alias("payload"),
    ).filter(F.octet_length("payload") == need)
    return augment_stats(d, w=8, h=8)


@register(
    "l6_curation_v2",
    # One CTE chain = the three r6 operators composed: exact duplicate-span
    # gate -> hashed-classifier gate -> sqrt-temperature budget over the
    # survivors. Every stage integer-exact, so the 5-row funnel hashes.
    oracle="""
WITH tok AS (
  SELECT doc_id, source, list_filter(string_split(text, ' '), t -> t != '') AS t
  FROM documents),
w AS (
  SELECT doc_id, array_to_string(list_slice(t, i, i + 9), ' ') AS span
  FROM tok, UNNEST(range(1, GREATEST(len(t) - 9, 0) + 1)) AS u(i)),
c AS (SELECT span, COUNT(*) AS c FROM w GROUP BY span),
dup AS (SELECT doc_id, SUM(CASE WHEN c.c >= 2 THEN 1 ELSE 0 END) AS n_dup
        FROM w JOIN c USING (span) GROUP BY doc_id),
d1 AS (  -- span gate: drop docs containing ANY corpus-duplicated 10-gram
  SELECT tok.doc_id, tok.source, tok.t FROM tok
  LEFT JOIN dup ON tok.doc_id = dup.doc_id
  WHERE COALESCE(dup.n_dup, 0) = 0),
wt AS (
  SELECT range AS b, CAST((range * 2654435761) % 16 - 8 AS BIGINT) AS wgt
  FROM range(0, 256)),
tb AS (
  SELECT d1.doc_id, d1.source,
         (strpos('0123456789abcdef', substr(md5(tk), 1, 1)) - 1) * 16
           + (strpos('0123456789abcdef', substr(md5(tk), 2, 1)) - 1) AS b
  FROM d1, UNNEST(d1.t) AS u(tk)),
scored AS (
  SELECT doc_id, source, COUNT(*) AS n_tokens, SUM(wgt) AS score
  FROM tb JOIN wt USING (b) GROUP BY doc_id, source),
d2 AS (SELECT * FROM scored WHERE score >= 0),
per AS (
  SELECT d1.source,
         COUNT(*) AS n_after_dedup,
         CAST(COALESCE(SUM(CASE WHEN d2.doc_id IS NOT NULL THEN 1 END), 0) AS BIGINT) AS n_after_quality,
         CAST(COALESCE(SUM(d2.n_tokens), 0) AS BIGINT) AS kept_tokens
  FROM d1 LEFT JOIN d2 ON d1.doc_id = d2.doc_id
  GROUP BY d1.source),
tot0 AS (SELECT source, COUNT(*) AS n_in FROM documents GROUP BY source),
r0 AS (SELECT p.source, n_in, n_after_dedup, n_after_quality, kept_tokens,
              CAST(floor(sqrt(CAST(kept_tokens AS DOUBLE))) AS BIGINT) AS r
       FROM per p JOIN tot0 USING (source)),
r1 AS (SELECT *, CASE WHEN (r + 1) * (r + 1) <= kept_tokens THEN r + 1 ELSE r END AS r2 FROM r0),
s AS (SELECT source, n_in, n_after_dedup, n_after_quality, kept_tokens,
             CASE WHEN r2 * r2 > kept_tokens THEN r2 - 1 ELSE r2 END AS sq
      FROM r1),
tots AS (SELECT CAST(SUM(sq) AS BIGINT) AS tot_s FROM s)
SELECT source, CAST(n_in AS BIGINT) AS n_in,
       CAST(n_after_dedup AS BIGINT) AS n_after_dedup,
       n_after_quality, kept_tokens,
       CAST(CASE WHEN tot_s > 0 THEN (10000 * sq) // tot_s ELSE 0 END AS BIGINT) AS temp_bp
FROM s, tots
""",
    tags=("L6", "L2", "L4"),
)
def l6_curation_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation pipeline v2 — the round's new operators composed into one
    funnel, per source: (1) exact duplicate-SPAN gate (drop any doc with
    a corpus-duplicated word 10-gram — the Lee-et-al policy), (2) hashed
    linear quality classifier (broadcast weight table, keep score >= 0),
    (3) sqrt-temperature mixture weights over the SURVIVING token mass.
    All three stages share one documents scan; every number is
    integer-exact, so the whole funnel hash-checks against one DuckDB CTE
    chain. The production shape: each gate is a column predicate over the
    previous stage's frame — Catalyst pipelines them; nothing
    materializes between stages."""
    from ..operators.dedup import duplicate_span_stats

    from .helpers import hash_weights256, isqrt_long, md5_bucket256

    docs = T(spark, sf_dir, "documents").select("doc_id", "source", "text")
    spans = duplicate_span_stats(docs, "doc_id", "text", n=10)
    d1 = (
        docs.join(spans, "doc_id")
        .filter(F.col("n_dup_spans") == 0)
        .select("doc_id", "source", "text")
    )
    weights = hash_weights256(spark).withColumnRenamed("wt", "wgt")
    tb = d1.select(
        "doc_id", "source", F.explode(tokens("text")).alias("tk")
    ).select("doc_id", "source", md5_bucket256("tk").alias("b"))
    scored = (
        tb.join(F.broadcast(weights), "b")
        .groupBy("doc_id", "source")
        .agg(F.count(F.lit(1)).alias("n_tokens"), F.sum("wgt").alias("score"))
    )
    d2 = scored.filter(F.col("score") >= 0)
    per = (
        d1.join(d2.select("doc_id", "n_tokens"), "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_after_dedup"),
            F.sum(F.col("n_tokens").isNotNull().cast("long")).alias("n_after_quality"),
            F.coalesce(F.sum("n_tokens"), F.lit(0)).cast("long").alias("kept_tokens"),
        )
    )
    tot0 = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_in"))
    sq = isqrt_long("kept_tokens")
    s = per.join(tot0, "source").select(
        "source", "n_in", "n_after_dedup", "n_after_quality", "kept_tokens",
        sq.alias("sq"),
    )
    tots = s.agg(F.sum("sq").cast("long").alias("tot_s"))
    return s.crossJoin(F.broadcast(tots)).select(
        "source",
        F.col("n_in").cast("long").alias("n_in"),
        F.col("n_after_dedup").cast("long").alias("n_after_dedup"),
        "n_after_quality",
        "kept_tokens",
        F.expr(
            "CAST(CASE WHEN tot_s > 0 THEN (10000 * sq) DIV tot_s ELSE 0 END AS BIGINT)"
        ).alias("temp_bp"),
    )


@register(
    "l4_dsir_resample",
    # Hashed-feature importance weighting, integer-exact end to end:
    # 256 md5 buckets, add-one smoothing, ratio in basis points via
    # BIGINT floor division — no log/float anywhere, so both engines
    # agree bit-for-bit. Weight per token instance:
    # ((cnt_t+1)(N_r+256)·1e4) // ((cnt_r+1)(N_t+256)); doc score = sum.
    oracle="""
WITH toks AS (
  SELECT doc_id, lang,
         unnest(list_filter(string_split(lower(text), ' '), t -> t != '')) AS tok
  FROM documents),
tb AS (
  SELECT doc_id, lang,
         CAST((strpos('0123456789abcdef', substr(md5(tok), 1, 1)) - 1) * 16
            + (strpos('0123456789abcdef', substr(md5(tok), 2, 1)) - 1) AS BIGINT) AS bucket
  FROM toks),
counts AS (
  SELECT bucket,
         CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS cnt_t,
         CAST(SUM(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS BIGINT) AS cnt_r
  FROM tb GROUP BY 1),
totals AS (
  SELECT CAST(SUM(cnt_t) AS BIGINT) AS n_t, CAST(SUM(cnt_r) AS BIGINT) AS n_r
  FROM counts),
w AS (
  SELECT t.doc_id, t.lang,
         ((c.cnt_t + 1) * (tt.n_r + 256) * 10000)
           // ((c.cnt_r + 1) * (tt.n_t + 256)) AS w_bp
  FROM tb t JOIN counts c USING (bucket) CROSS JOIN totals tt
  WHERE t.lang <> 'en'),
scored AS (
  SELECT doc_id, lang, COUNT(*) AS n_tokens, CAST(SUM(w_bp) AS BIGINT) AS score_bp
  FROM w GROUP BY 1, 2)
SELECT doc_id, lang, n_tokens, score_bp
FROM scored
ORDER BY score_bp DESC, doc_id
LIMIT 25
""",
    tags=("L4", "L7"),
)
def l4_dsir_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023, public): score RAW
    documents (non-en) by importance under a hashed bag-of-words model of
    the TARGET distribution (en docs) vs the raw distribution, then keep
    the top-25 — 'select web data that looks like the target domain'.
    Features are 256 md5 token buckets (hashing trick); the per-token
    target/raw probability ratio uses add-one smoothing and BIGINT
    basis-point floor division instead of log-space floats, so the score
    is integer-deterministic cross-engine (the repo's exact-arithmetic
    rule; at production scale the same plan runs in log-space doubles).
    Scale shape: ONE token pass builds both distributions (conditional
    aggregation, 256-row result), the weight join is a broadcast of that
    256-row table plus a one-row totals broadcast — the corpus is
    re-read once and never shuffled on anything wider than doc_id."""
    from ..operators.parallelism import TOKEN_KERNEL_MIN_BYTES, fan_out_shared

    # r15 (verdict item 1): SHARED, byte-gated fan-out — the token pass
    # feeds two branches (distribution build + scoring side); r14's
    # per-branch RoundRobin repartitions regressed this query 0.81x, and at
    # bench scale the explode is too light to fan at all (A/B: no-fan
    # 0.97 s vs shared 1.28 s vs r14 plain 1.24 s).
    docs = fan_out_shared(
        T(spark, sf_dir, "documents").select("doc_id", "lang", "text"),
        min_bytes=TOKEN_KERNEL_MIN_BYTES,
    )
    toks = docs.select(
        "doc_id",
        "lang",
        F.explode(
            F.filter(F.split(F.lower("text"), " "), lambda t: t != "")
        ).alias("tok"),
    )
    tb = toks.withColumn(
        "bucket",
        F.conv(F.substring(F.md5(F.col("tok").cast("binary")), 1, 2), 16, 10).cast("long"),
    )
    # localCheckpoint: ≤256 rows by construction (md5 bucket space), and it
    # stops `totals` from re-running the whole token pass as an independent
    # subtree — ONE distribution-build pass at any scale (guide §5).
    counts = tb.groupBy("bucket").agg(
        F.sum((F.col("lang") == "en").cast("long")).alias("cnt_t"),
        F.sum((F.col("lang") != "en").cast("long")).alias("cnt_r"),
    ).localCheckpoint()
    totals = counts.agg(
        F.sum("cnt_t").cast("long").alias("n_t"), F.sum("cnt_r").cast("long").alias("n_r")
    )
    w = (
        tb.filter(F.col("lang") != "en")
        .join(F.broadcast(counts), "bucket")
        .crossJoin(F.broadcast(totals))
        .withColumn(
            "w_bp",
            F.expr(
                "((cnt_t + 1) * (n_r + 256) * 10000) DIV ((cnt_r + 1) * (n_t + 256))"
            ),
        )
    )
    scored = w.groupBy("doc_id", "lang").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("w_bp").cast("long").alias("score_bp"),
    )
    return scored.orderBy(F.desc("score_bp"), F.asc("doc_id")).limit(25)


@register(
    "l3_matryoshka_topk",
    # Two-stage retrieval, both stages mirrored exactly: prefix-8 cosine
    # shortlist (top-50, 6-dp round + id tie-break) then full-64 rescore
    # (top-10). DuckDB slices the list, Spark slices the array.
    oracle="""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 7),
pref AS (
  SELECT e.vec_id,
         CAST(unnest(e.embedding[1:8]) AS DOUBLE) AS x,
         CAST(unnest((SELECT qv[1:8] FROM q)) AS DOUBLE) AS y
  FROM embeddings e),
s8 AS (
  SELECT vec_id, ROUND(SUM(x * y) / (SQRT(SUM(x * x)) * SQRT(SUM(y * y))), 6) AS cos8
  FROM pref GROUP BY 1),
short AS (
  SELECT vec_id, cos8, ROW_NUMBER() OVER (ORDER BY cos8 DESC, vec_id) AS rn
  FROM s8),
cand AS (SELECT vec_id, cos8 FROM short WHERE rn <= 50),
fullv AS (
  SELECT e.vec_id,
         CAST(unnest(e.embedding) AS DOUBLE) AS x,
         CAST(unnest((SELECT qv FROM q)) AS DOUBLE) AS y
  FROM embeddings e
  WHERE e.vec_id IN (SELECT vec_id FROM cand)),
fs AS (
  SELECT vec_id, ROUND(SUM(x * y) / (SQRT(SUM(x * x)) * SQRT(SUM(y * y))), 6) AS cos_sim
  FROM fullv GROUP BY 1)
SELECT f.vec_id, c.cos8, f.cos_sim
FROM fs f JOIN cand c USING (vec_id)
ORDER BY f.cos_sim DESC, f.vec_id
LIMIT 10
""",
    tags=("L3",),
)
def l3_matryoshka_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka retrieval (MRL, Kusupati et al. 2022, public): ANN over
    nested-representation embeddings — stage 1 scans only the FIRST 8 of
    64 dimensions (1/8th the arithmetic and, with a prefix-materialized
    column, 1/8th the bytes read) to shortlist 50 candidates, stage 2
    rescores just those 50 with the full vector. Both stages are JVM
    zip_with/aggregate folds; stage 1 is a TakeOrderedAndProject top-k
    (no global sort) and stage 2's candidate set joins back as a
    broadcast. This is the third index-free ANN family next to IVF
    (partition pruning) and PQ (byte codes): prefix-dim pruning composes
    with either at 100 TB."""
    from ..operators.similarity import cosine

    e = T(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in e.filter(F.col("vec_id") == 7).head()["embedding"]]
    q8 = F.lit(qvec[:8])
    qfull = F.lit(qvec)

    shortlist = (
        e.select(
            "vec_id",
            F.round(cosine(F.slice("embedding", 1, 8), q8), 6).alias("cos8"),
        )
        .orderBy(F.desc("cos8"), F.asc("vec_id"))
        .limit(50)
    )
    rescored = (
        e.join(F.broadcast(shortlist), "vec_id")
        .select(
            "vec_id",
            "cos8",
            F.round(cosine(F.col("embedding"), qfull), 6).alias("cos_sim"),
        )
    )
    return rescored.orderBy(F.desc("cos_sim"), F.asc("vec_id")).limit(10)


@register(
    "l7_curriculum_order",
    # Deterministic curriculum: difficulty = avg token length in milli-
    # chars (integer floor division), fixed stage cuts (5300/5460), then
    # a seed-keyed md5 shuffle WITHIN each stage. ord is the global
    # training-read order: all of stage 0, then 1, then 2.
    oracle="""
WITH t AS (
  SELECT doc_id,
         n_chars,
         CAST(len(list_filter(string_split(lower(text), ' '), x -> x != '')) AS BIGINT)
           AS n_tokens
  FROM documents),
d AS (
  SELECT doc_id, n_tokens,
         (1000 * n_chars) // (n_tokens + 1) AS difficulty_milli
  FROM t),
s AS (
  SELECT doc_id, n_tokens, difficulty_milli,
         CASE WHEN difficulty_milli < 5300 THEN 0
              WHEN difficulty_milli < 5460 THEN 1
              ELSE 2 END AS stage,
         md5('cur17:' || CAST(doc_id AS VARCHAR)) AS h
  FROM d)
SELECT doc_id, n_tokens, difficulty_milli, CAST(stage AS BIGINT) AS stage,
       CAST(ROW_NUMBER() OVER (ORDER BY stage, h, doc_id) AS BIGINT) AS ord
FROM s
""",
    tags=("L7", "W1"),
)
def l7_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum training order: rank the corpus easy→hard (difficulty =
    average token length, integer milli-chars — a closed-form proxy any
    real pipeline swaps for a model score), bucket into three fixed
    stages, and emit the exact global read order with a seed-keyed md5
    shuffle inside each stage (same reproducible-shuffle contract as
    l7_corpus_shuffle: the order is a pure function of (seed, doc_id)).
    Scale shape: difficulty is a narrow per-row map; the only wide op is
    the final rank. A production variant makes `ord` per-shard like
    l7_epoch_reshard; here the single window keeps the oracle 1:1."""
    from pyspark.sql import Window

    docs = T(spark, sf_dir, "documents").select("doc_id", "n_chars", "text")
    t = docs.select(
        "doc_id",
        "n_chars",
        F.size(F.filter(F.split(F.lower("text"), " "), lambda x: x != ""))
        .cast("long")
        .alias("n_tokens"),
    )
    d = t.withColumn(
        "difficulty_milli", F.expr("(1000 * n_chars) DIV (n_tokens + 1)")
    )
    s = d.select(
        "doc_id",
        "n_tokens",
        "difficulty_milli",
        F.when(F.col("difficulty_milli") < 5300, 0)
        .when(F.col("difficulty_milli") < 5460, 1)
        .otherwise(2)
        .cast("long")
        .alias("stage"),
        F.md5(
            F.concat(F.lit("cur17:"), F.col("doc_id").cast("string")).cast("binary")
        ).alias("h"),
    )
    w = Window.orderBy("stage", "h", "doc_id")
    return s.select(
        "doc_id", "n_tokens", "difficulty_milli", "stage",
        F.row_number().over(w).cast("long").alias("ord"),
    )


@register(
    "l2_cdc_chunks",
    # Content-defined boundaries: cut AFTER token i when the md5 of the
    # 3-gram ending at i starts with nibble '0' (p = 1/16 -> ~16-token
    # chunks). chunk_id = running count of prior cuts; chunk identity =
    # md5 of its ordered tokens; a chunk is duplicated if its hash occurs
    # >= 2 times corpus-wide. Both engines mirror every step exactly.
    oracle="""
WITH tok AS (
  SELECT doc_id, source, list_filter(string_split(text, ' '), t -> t != '') AS t
  FROM documents),
pos AS (
  SELECT doc_id, source, i, t[i] AS tok,
         CASE WHEN i >= 3 AND substr(md5(
                array_to_string(list_slice(t, i - 2, i), ' ')), 1, 1) = '0'
              THEN 1 ELSE 0 END AS b
  FROM tok, UNNEST(range(1, len(t) + 1)) AS u(i)),
ch AS (
  SELECT doc_id, source, i, tok,
         COALESCE(SUM(b) OVER (PARTITION BY doc_id ORDER BY i
                               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS chunk_id
  FROM pos),
chunks AS (
  SELECT doc_id, source, chunk_id,
         md5(string_agg(tok, ' ' ORDER BY i)) AS chash
  FROM ch GROUP BY 1, 2, 3),
freq AS (SELECT chash, COUNT(*) AS c FROM chunks GROUP BY 1),
per AS (
  SELECT source, COUNT(*) AS n_chunks,
         SUM(CASE WHEN f.c >= 2 THEN 1 ELSE 0 END) AS n_dup
  FROM chunks JOIN freq f USING (chash)
  GROUP BY 1)
SELECT source,
       CAST(n_chunks AS BIGINT) AS n_chunks,
       CAST(n_dup AS BIGINT) AS n_dup_chunks,
       CAST((10000 * n_dup) // n_chunks AS BIGINT) AS dup_bp
FROM per
""",
    tags=("L2", "L4"),
)
def l2_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (the storage-dedup classic — Rabin-style
    rolling cuts — applied to corpus prep): chunk boundaries depend only
    on LOCAL token context (hash of the trailing 3-gram), so an insertion
    early in a document shifts no downstream boundaries and near-identical
    documents still share most chunk hashes — the property fixed-width
    chunking (l7_chunking) lacks and exact span counting (l2_duplicate_
    spans) pays O(n) spans per doc for. Per-source output: chunk count,
    corpus-wide duplicated chunks, dup share in basis points. Scale
    shape: the boundary pass is a per-doc window (parallel across docs,
    one doc_id exchange), chunk identity is an md5 group-by, and the
    frequency join shuffles 32-byte hashes — at 100 TB swap md5 for
    xxhash64 and the shuffle moves 8-byte keys, same plan."""
    from pyspark.sql import Window

    from ..operators.parallelism import TOKEN_KERNEL_MIN_BYTES, fan_out

    # r15 (verdict item 1): byte-gated fan_out — the chunk pipeline is now
    # a SINGLE subtree (see the per-source aggregate below), so the plain
    # form is safe, and at bench scale the posexplode is too light to fan
    # at all (A/B: no-fan 0.94 s vs plain 1.20 s vs r14 two-branch 1.56 s).
    docs = fan_out(
        T(spark, sf_dir, "documents").select("doc_id", "source", "text"),
        min_bytes=TOKEN_KERNEL_MIN_BYTES,
    ).select(
        "doc_id",
        "source",
        F.filter(F.split(F.col("text"), " "), lambda x: x != "").alias("t"),
    )
    pos = docs.select(
        "doc_id",
        "source",
        F.posexplode("t").alias("i0", "tok"),
        F.col("t"),
    ).select(
        "doc_id",
        "source",
        (F.col("i0") + 1).alias("i"),
        "tok",
        F.when(
            (F.col("i0") + 1 >= 3)
            & (
                F.substring(
                    F.md5(F.expr("concat_ws(' ', slice(t, i0 - 1, 3))").cast("binary")),
                    1,
                    1,
                )
                == "0"
            ),
            1,
        )
        .otherwise(0)
        .alias("b"),
    )
    w = Window.partitionBy("doc_id").orderBy("i").rowsBetween(
        Window.unboundedPreceding, -1
    )
    ch = pos.withColumn("chunk_id", F.coalesce(F.sum("b").over(w), F.lit(0)))
    chunks = ch.groupBy("doc_id", "source", "chunk_id").agg(
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("i", "tok"))),
                    lambda s: s["tok"],
                ),
                " ",
            ).cast("binary")
        ).alias("chash")
    )
    # r15 (verdict item 1): the freq groupBy + join back re-ran the whole
    # explode→window→md5 pipeline as a second subtree (and, with r14's
    # fan_out, a second RoundRobin shuffle — driver 0.76x). Aggregating to
    # (chash, source) first computes `chunks` ONCE; the global chunk
    # frequency is then a window over the tiny aggregated frame (bounded
    # at ≤ n_sources rows per chash — no skewable hot key).
    g = chunks.groupBy("chash", "source").agg(F.count(F.lit(1)).alias("cs"))
    t = F.sum("cs").over(Window.partitionBy("chash"))
    per = (
        g.withColumn("t", t)
        .groupBy("source")
        .agg(
            F.sum("cs").alias("n_chunks"),
            F.sum(F.when(F.col("t") >= 2, F.col("cs")).otherwise(F.lit(0))).alias(
                "n_dup_chunks"
            ),
        )
    )
    return per.select(
        "source",
        F.col("n_chunks").cast("long").alias("n_chunks"),
        F.col("n_dup_chunks").cast("long").alias("n_dup_chunks"),
        F.expr("CAST((10000 * n_dup_chunks) DIV n_chunks AS BIGINT)").alias("dup_bp"),
    )


@register(
    "l3_ivf_compact",
    oracle="""
WITH q AS (SELECT embedding AS q_vec FROM embeddings WHERE vec_id = 1),
scored AS (
  SELECT e.vec_id,
         CAST(unnest(e.embedding) AS DOUBLE) AS x,
         CAST(unnest(q.q_vec) AS DOUBLE) AS y
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id <> 1 AND e.vec_id % 5 <> 0),
agg AS (
  SELECT vec_id,
         ROUND(SUM(x*y) / (SQRT(SUM(x*x)) * SQRT(SUM(y*y))), 6) AS cos_sim
  FROM scored GROUP BY 1)
SELECT vec_id, cos_sim FROM agg ORDER BY cos_sim DESC, vec_id LIMIT 10
""",
    tags=("L3", "S7"),
)
def l3_ivf_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The OFFLINE half of vector unlearning (completes l3_ivf_delete's
    merge-on-read contract): tombstone-delete every vec_id % 5 == 0, then
    `compact_ivf_index` rewrites ONLY the affected clusters, physically
    drops the dead rows, and removes the tombstone table. In-query audit:
    rows were reclaimed, at least one untouched cluster kept its original
    files, and the post-compaction physical row count equals the live
    count (no residual masking needed). The returned all-probe top-10 of
    the compacted index hash-matches the oracle's arithmetic exclusion —
    compaction changed bytes, never results. At 100 TB this is the
    scheduled VACUUM that keeps per-probe anti-join cost from growing
    with delete history."""
    import os
    import tempfile

    from ..operators.similarity import (
        build_ivf_index,
        compact_ivf_index,
        delete_from_ivf_index,
        read_ivf_index,
        seeded_centroids,
        topk_cosine,
    )

    e = T(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cents = seeded_centroids(e, c=8)
    path = tempfile.mkdtemp(prefix="rdl_ivfcpt_")
    build_ivf_index(e, cents, path)
    delete_from_ivf_index(e.filter(F.col("vec_id") % 5 == 0), path)

    n_live = read_ivf_index(spark, path).count()
    stats = compact_ivf_index(spark, path)
    assert stats["rows_removed"] > 0
    assert not os.path.isdir(os.path.join(path, "_tombstones"))
    assert spark.read.parquet(path).count() == n_live  # dead rows are GONE

    qvec = [float(x) for x in e.filter(F.col("vec_id") == 1).head()["embedding"]]
    live = read_ivf_index(spark, path).filter(F.col("vec_id") != 1)
    return topk_cosine(live, qvec, k=10, round_to=6)


@register(
    "l2_oph_neardup",
    # Same exact-pairs contract as l2_word_jaccard: the oracle knows
    # nothing about OPH — hash-equality proves the one-pass signatures'
    # banding lost NO qualifying pair before the exact verify.
    oracle="""
WITH tok AS (
  SELECT doc_id, unnest(list_distinct(list_filter(string_split(text, ' '), t -> t != ''))) AS w
  FROM documents WHERE doc_id < 1000
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY 1),
common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
  FROM tok a JOIN tok b ON a.w = b.w AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       c * 1.0 / (sa.n + sb.n - c) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.9
""",
    tags=("L2",),
)
def l2_oph_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE-PERMUTATION MinHash near-dup (operators/minhash.py::
    oph_signature — Li 2012 + rotation densification, Shrivastava 2014):
    the signature pass hashes each distinct token ONCE and bins it
    instead of evaluating 64 permutations per token. Measured honestly
    (see the operator docstring): end-to-end parity with the classic
    pipeline at k=64 — the win is asymptotic (grows with k and document
    length), not a headline speedup here. Candidates come from the same
    16×4 banding, the exact word-Jaccard verify is unchanged, and the
    oracle is the full exact pair set at j ≥ 0.9 — so the hash proves
    the one-pass signatures' banding missed nothing, which is the
    property that makes OPH safe to adopt when k does need to grow."""
    from ..operators.minhash import jaccard_pairs, lsh_candidate_pairs, oph_signature

    d = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    sig = oph_signature(
        d.select("doc_id", "text"), "text", k=64, w=1, id_cols=["doc_id"]
    )
    cand = lsh_candidate_pairs(sig, "doc_id", bands=16, rows=4)
    return jaccard_pairs(d, "doc_id", "text", w=1, threshold=0.9, candidates=cand)


@register(
    "l6_hard_negative_mining",
    oracle="""
WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec, label AS q_label
           FROM embeddings WHERE vec_id < 5),
scored AS (
  SELECT q.q_id, q.q_label, e.vec_id, e.label,
         CAST(unnest(e.embedding) AS DOUBLE) AS x,
         CAST(unnest(q.q_vec) AS DOUBLE) AS y
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id <> q.q_id
),
agg AS (
  SELECT q_id, q_label, vec_id, label,
         ROUND(SUM(x * y) / (SQRT(SUM(x * x)) * SQRT(SUM(y * y))), 6) AS cs
  FROM scored GROUP BY q_id, q_label, vec_id, label
),
ranked AS (
  SELECT q_id, vec_id, cs,
         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cs DESC, vec_id) AS rn
  FROM agg WHERE label <> q_label
)
SELECT q_id, vec_id AS negative_id, cs AS cos_sim,
       CAST(rn AS BIGINT) AS rank
FROM ranked WHERE rn <= 5
""",
    tags=("L6", "L3", "W6"),
)
def l6_hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HARD-NEGATIVE mining for contrastive retriever training (DPR /
    SentenceTransformers practice, public): for each query vector, the
    top-k most-similar corpus vectors whose LABEL differs — maximally
    confusable non-matches, the examples that actually move a
    bi-encoder. In-batch random negatives are nearly free but easy;
    hard negatives need a similarity search with a relevance predicate
    PUSHED BELOW the top-k (filter-then-rank: a rank-then-filter would
    return fewer than k whenever positives crowd the head). Queries
    broadcast; scoring is the same JVM zip_with/aggregate cosine the L3
    family uses; the label predicate applies before the per-query
    WindowGroupLimit, so the shuffle carries only n_queries x k
    survivors per partition. At 100 TB the corpus side routes through
    the IVF index (probe clusters, then this same filter+rank) — the
    predicate composes with any of the L3 index paths unchanged."""
    from pyspark.sql import Window

    from ..operators.similarity import cosine

    e = T(spark, sf_dir, "embeddings")
    q = F.broadcast(
        e.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("q_id"),
            F.col("embedding").alias("q_vec"),
            F.col("label").alias("q_label"),
        )
    )

    scored = (
        e.crossJoin(q)
        .filter(
            (F.col("vec_id") != F.col("q_id"))
            & (F.col("label") != F.col("q_label"))  # negatives only
        )
        .select(
            "q_id",
            "vec_id",
            F.round(cosine(F.col("embedding"), F.col("q_vec")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select(
            "q_id",
            F.col("vec_id").alias("negative_id"),
            "cos_sim",
            F.col("rank").cast("long").alias("rank"),
        )
    )


@register(
    "l7_resume_skip",
    oracle="""
WITH assigned AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5('e1:' || doc_id), 1, 8)) AS BIGINT) AS h
  FROM documents),
ranked AS (
  SELECT h % 8 AS shard, doc_id,
         ROW_NUMBER() OVER (PARTITION BY h % 8 ORDER BY h, doc_id) AS pos
  FROM assigned),
consumed AS (SELECT CAST(COUNT(*) AS BIGINT) // 20 AS c FROM documents)
SELECT shard,
       CAST(COUNT(*) AS BIGINT) AS n_remaining,
       CAST(MIN(CASE WHEN pos = (SELECT c FROM consumed) + 1
                     THEN doc_id END) AS BIGINT) AS next_doc_id,
       CAST(SUM(doc_id * pos) AS BIGINT) AS remaining_fingerprint
FROM ranked
WHERE pos > (SELECT c FROM consumed)
GROUP BY shard
""",
    tags=("L7", "W1", "F1"),
)
def l7_resume_skip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mid-epoch TRAINING RESUME: reconstruct exactly the not-yet-consumed
    remainder of epoch 1's data order from nothing but (epoch,
    steps-consumed) — no stored shuffle state, no replay. Because the
    epoch order is pure hash math (l7_epoch_reshard's md5 permutation),
    'skip the first C positions per shard' is a filter on the recomputed
    within-shard rank: any restarted worker derives its remaining
    sequence independently, and two workers can never disagree about
    what position C+1 is. The fingerprint sums doc_id x ORIGINAL
    position over the remainder, pinning the exact resumed SEQUENCE
    (an off-by-one skip, a reshuffled tail, or a double-consumed doc all
    break the hash). C = |corpus|/20 here (~a step count mid-epoch);
    at 100 TB this is one hash projection + one windowed filter per
    restart — versus checkpointing a materialized global order."""
    from pyspark.sql import Window

    d = T(spark, sf_dir, "documents").select("doc_id")
    n = d.count()
    c = n // 20  # consumed positions per shard at the resume point
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("e1:"), F.col("doc_id"))), 1, 8), 16, 10
    ).cast("long")
    w = Window.partitionBy(F.col("h") % 8).orderBy("h", "doc_id")
    ranked = d.select("doc_id", h.alias("h")).select(
        (F.col("h") % 8).alias("shard"),
        "doc_id",
        F.row_number().over(w).alias("pos"),
    )
    rem = ranked.filter(F.col("pos") > c)
    return rem.groupBy("shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_remaining"),
        F.min(F.when(F.col("pos") == c + 1, F.col("doc_id")))
        .cast("long")
        .alias("next_doc_id"),
        F.sum(F.col("doc_id") * F.col("pos")).cast("long").alias("remaining_fingerprint"),
    )


@register(
    "l6_mrr_eval",
    oracle="""
WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings WHERE vec_id < 10),
scored AS (
  SELECT q.q_id, e.vec_id,
         CAST(unnest(e.embedding) AS DOUBLE) AS x,
         CAST(unnest(q.q_vec) AS DOUBLE) AS y
  FROM embeddings e CROSS JOIN q
),
agg AS (
  SELECT q_id, vec_id,
         ROUND(SUM(x * y) / (SQRT(SUM(x * x)) * SQRT(SUM(y * y))), 6) AS cs
  FROM scored GROUP BY q_id, vec_id
),
ranked AS (
  SELECT q_id, vec_id,
         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cs DESC, vec_id) AS rn
  FROM agg
),
rel AS (
  SELECT q_id, rn FROM ranked WHERE rn <= 100 AND vec_id = q_id + 100
)
SELECT q.q_id,
       CAST(COALESCE(rel.rn, 0) AS BIGINT) AS rel_rank,
       CAST(CASE WHEN rel.rn IS NULL THEN 0 ELSE 1000000 // rel.rn END
            AS BIGINT) AS rr_ppm
FROM (SELECT DISTINCT q_id FROM q) q LEFT JOIN rel USING (q_id)
""",
    tags=("L6", "L3", "W6"),
)
def l6_mrr_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality evaluation: MRR@100 of a brute-force cosine
    retriever against a deterministic relevance labeling (query q's
    relevant item is vec_id q+100 — the labeling is arbitrary; the
    MACHINERY is the deliverable: rank the corpus per query, find the
    relevant item's rank, emit its reciprocal). Reciprocal rank is
    FIXED-POINT (1000000 DIV rank) — exact integer cross-engine math,
    never a libm-parity gamble (the l7_temperature_sampling lesson);
    ranking ties break on ROUND(cos,6) then vec_id, the l3 family's
    proven-hash-stable total order. Scale shape: queries broadcast, one
    corpus pass scores all queries (zip_with/aggregate JVM folds),
    WindowGroupLimit keeps 100 per query before any shuffle — an eval
    harness over a 100 TB corpus is one scan, not |Q| scans."""
    from pyspark.sql import Window

    from ..operators.similarity import topk_cosine_join

    e = T(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    top = topk_cosine_join(q, e, k=100, round_to=6)
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    ranked = top.withColumn("rn", F.row_number().over(w))
    rel = ranked.filter(F.col("vec_id") == F.col("q_id") + 100).select(
        "q_id", "rn"
    )
    return (
        q.select("q_id")
        .join(rel, "q_id", "left")
        .select(
            "q_id",
            F.coalesce(F.col("rn"), F.lit(0)).cast("long").alias("rel_rank"),
            F.when(F.col("rn").isNull(), F.lit(0))
            .otherwise(F.expr("1000000 DIV rn"))
            .cast("long")
            .alias("rr_ppm"),
        )
    )


# round(1e6 / log2(rank+1)) for rank 1..10 — IDENTICAL literals on both
# engines, so graded-relevance DCG reduces to exact integer arithmetic
# (never a libm log2-parity gamble; the l7_temperature_sampling rule)
_DCG_W = [1000000, 630930, 500000, 430677, 386853, 356207, 333333, 315465, 301030, 289065]
_DCG_CASE_SQL = "CASE rn " + " ".join(
    f"WHEN {r} THEN {w}" for r, w in enumerate(_DCG_W, start=1)
) + " END"


@register(
    "l6_dcg_eval",
    oracle=f"""
WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings WHERE vec_id < 10),
scored AS (
  SELECT q.q_id, e.vec_id,
         CAST(unnest(e.embedding) AS DOUBLE) AS x,
         CAST(unnest(q.q_vec) AS DOUBLE) AS y
  FROM embeddings e CROSS JOIN q
),
agg AS (
  SELECT q_id, vec_id,
         ROUND(SUM(x * y) / (SQRT(SUM(x * x)) * SQRT(SUM(y * y))), 6) AS cs
  FROM scored GROUP BY q_id, vec_id
),
ranked AS (
  SELECT q_id, vec_id,
         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cs DESC, vec_id) AS rn
  FROM agg
)
SELECT q_id,
       CAST(SUM((vec_id % 4) * ({_DCG_CASE_SQL})) AS BIGINT) AS dcg_fp,
       CAST(SUM(vec_id % 4) AS BIGINT) AS graded_sum
FROM ranked WHERE rn <= 10
GROUP BY q_id
""",
    tags=("L6", "L3", "W6"),
)
def l6_dcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graded retrieval evaluation: DCG@10 per query over the brute-force
    cosine ranking, with synthetic integer grades (vec_id % 4). The
    1/log2(rank+1) discount is a LITERAL fixed-point lookup — ten
    round(1e6/log2(r+1)) constants embedded identically in query and
    oracle — so the whole metric is exact integer math cross-engine
    (libm log2 parity is never trusted; the established fixed-point
    rule). Same one-scan-for-all-queries shape as l6_mrr_eval:
    broadcast queries, JVM cosine folds, WindowGroupLimit top-10."""
    from pyspark.sql import Window

    from ..operators.similarity import topk_cosine_join

    e = T(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    top = topk_cosine_join(q, e, k=10, round_to=6)
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    ranked = top.withColumn("rn", F.row_number().over(w))
    weight = F.expr(_DCG_CASE_SQL)
    return ranked.groupBy("q_id").agg(
        F.sum((F.col("vec_id") % 4) * weight).cast("long").alias("dcg_fp"),
        F.sum(F.col("vec_id") % 4).cast("long").alias("graded_sum"),
    )


@register(
    "l4_lang_confidence",
    oracle="""
WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS toks
  FROM documents),
s AS (
  SELECT doc_id,
         len(list_intersect(toks, ['the','and','of','to','a'])) AS s_en,
         len(list_intersect(toks, ['el','la','de','los','y'])) AS s_es,
         len(list_intersect(toks, ['der','die','und','das','nicht'])) AS s_de
  FROM t),
m AS (
  SELECT doc_id, s_en, s_es, s_de,
         GREATEST(s_en, s_es, s_de) AS top1,
         s_en + s_es + s_de - GREATEST(s_en, s_es, s_de)
           - LEAST(s_en, s_es, s_de) AS top2
  FROM s)
SELECT doc_id,
       CASE WHEN top1 = 0 THEN 'unknown'
            WHEN s_en >= s_es AND s_en >= s_de THEN 'en'
            WHEN s_es >= s_de THEN 'es'
            ELSE 'de' END AS lang_pred,
       CAST(top1 AS BIGINT) AS top_score,
       CAST(top1 - top2 AS BIGINT) AS margin,
       CAST(CASE WHEN top1 > 0 AND top1 - top2 >= 1 THEN 1 ELSE 0 END
            AS BIGINT) AS confident
FROM m
""",
    tags=("L4",),
)
def l4_lang_confidence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language ID with CONFIDENCE — the production upgrade over
    l6_corpus_pipeline's argmax-only heuristic: per-language marker-token
    scores, the winning language by a deterministic tie order, and the
    top1−top2 MARGIN as the abstention signal (margin 0 → route to a
    heavier classifier instead of mislabeling; the CCNet/fastText
    practice). Pure column math: one array_intersect per language class
    over one tokenization, no UDF — at 100 TB this is a single projected
    scan whatever the language count. Marker lists are identical
    literals in both engines, so scores, argmax, and margins hash
    exactly."""
    t = tokens(F.col("text"))
    score = lambda ws: F.size(  # noqa: E731
        F.array_intersect(t, F.array(*[F.lit(w) for w in ws]))
    ).cast("long")
    d = T(spark, sf_dir, "documents").select(
        "doc_id",
        score(["the", "and", "of", "to", "a"]).alias("s_en"),
        score(["el", "la", "de", "los", "y"]).alias("s_es"),
        score(["der", "die", "und", "das", "nicht"]).alias("s_de"),
    )
    top1 = F.greatest("s_en", "s_es", "s_de")
    top2 = (
        F.col("s_en") + F.col("s_es") + F.col("s_de")
        - top1
        - F.least("s_en", "s_es", "s_de")
    )
    pred = (
        F.when(top1 == 0, F.lit("unknown"))
        .when(
            (F.col("s_en") >= F.col("s_es")) & (F.col("s_en") >= F.col("s_de")),
            F.lit("en"),
        )
        .when(F.col("s_es") >= F.col("s_de"), F.lit("es"))
        .otherwise(F.lit("de"))
    )
    return d.select(
        "doc_id",
        pred.alias("lang_pred"),
        top1.cast("long").alias("top_score"),
        (top1 - top2).cast("long").alias("margin"),
        F.when((top1 > 0) & (top1 - top2 >= 1), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("confident"),
    )


@register(
    "l7_token_budget_pack",
    oracle="""
WITH RECURSIVE d AS (
  SELECT doc_id, doc_id % 8 AS shard,
         LEAST(len(list_filter(string_split(text, ' '), t -> t != '')), 512)
           AS n_tokens,
         ROW_NUMBER() OVER (PARTITION BY doc_id % 8 ORDER BY doc_id) AS pos
  FROM documents),
packed AS (
  -- greedy first-fit-in-order, NO document straddling: a doc that would
  -- overflow the open 512-token bin starts the next bin
  SELECT shard, pos, doc_id, n_tokens, 0 AS bin_id, n_tokens AS fill
  FROM d WHERE pos = 1
  UNION ALL
  SELECT d.shard, d.pos, d.doc_id, d.n_tokens,
         CASE WHEN p.fill + d.n_tokens <= 512 THEN p.bin_id
              ELSE p.bin_id + 1 END,
         CASE WHEN p.fill + d.n_tokens <= 512 THEN p.fill + d.n_tokens
              ELSE d.n_tokens END
  FROM packed p JOIN d ON d.shard = p.shard AND d.pos = p.pos + 1)
SELECT shard, CAST(bin_id AS BIGINT) AS bin_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS tokens_used,
       CAST(512 - SUM(n_tokens) AS BIGINT) AS padding_waste,
       MIN(doc_id) AS first_doc
FROM packed
GROUP BY shard, bin_id
""",
    tags=("L4", "U3"),
)
def l7_token_budget_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NO-STRADDLE sequence packing (greedy first-fit in stable order): a
    document that would overflow the open 512-token bin CLOSES it and
    starts the next — the packing used when documents must stay intact
    (instruction tuning, contrastive pairs), versus l7_sequence_packing's
    concat-then-chunk. The fill state makes this inherently SEQUENTIAL
    per shard — no window expresses it — so it runs as a per-shard
    applyInPandas fold: Arrow-batched, O(shard) state, shards are the
    parallelism unit at 100 TB exactly like the training loader that
    consumes the bins. Oracle = a DuckDB recursive CTE replaying the same
    greedy fold; per-bin manifests (docs, tokens used, padding waste)
    hash exactly. Docs longer than the budget are clamped (LEAST) so
    every doc is placeable — both engines encode the same clamp."""
    import pandas as pd

    d = T(spark, sf_dir, "documents").select(
        "doc_id",
        (F.col("doc_id") % 8).alias("shard"),
        F.least(
            F.size(F.filter(F.split("text", " "), lambda t: t != F.lit(""))),
            F.lit(512),
        ).alias("n_tokens"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        bins, fill, b = [], 0, 0
        for n in pdf["n_tokens"]:
            if fill + n > 512:
                b, fill = b + 1, 0
            fill += n
            bins.append(b)
        pdf["bin_id"] = bins
        return pdf

    packed = d.groupBy("shard").applyInPandas(
        pack, "doc_id long, shard bigint, n_tokens int, bin_id long"
    )
    return packed.groupBy("shard", "bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("tokens_used"),
        (F.lit(512) - F.sum("n_tokens")).cast("long").alias("padding_waste"),
        F.min("doc_id").alias("first_doc"),
    )


@register(
    "l2_suffix_array_dups",
    oracle="""
WITH tok AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t != '') AS t
  FROM documents),
w AS (
  SELECT doc_id, lv.n,
         array_to_string(list_slice(t, i, i + lv.n - 1), ' ') AS span
  FROM tok, (VALUES (10), (20), (40)) AS lv(n),
       UNNEST(range(1, GREATEST(len(t) - (lv.n - 1), 0) + 1)) AS u(i)),
c AS (SELECT n, span, COUNT(*) AS c FROM w GROUP BY 1, 2),
p AS (
  SELECT doc_id,
         SUM(CASE WHEN w.n = 10 THEN 1 ELSE 0 END) AS n10,
         SUM(CASE WHEN w.n = 10 AND c.c >= 2 THEN 1 ELSE 0 END) AS d10,
         SUM(CASE WHEN w.n = 20 THEN 1 ELSE 0 END) AS n20,
         SUM(CASE WHEN w.n = 20 AND c.c >= 2 THEN 1 ELSE 0 END) AS d20,
         SUM(CASE WHEN w.n = 40 THEN 1 ELSE 0 END) AS n40,
         SUM(CASE WHEN w.n = 40 AND c.c >= 2 THEN 1 ELSE 0 END) AS d40
  FROM w JOIN c USING (n, span) GROUP BY doc_id)
SELECT d.doc_id,
       CAST((10000 * COALESCE(p.d10, 0))
            // GREATEST(COALESCE(p.n10, 0), 1) AS BIGINT) AS dup10_bp,
       CAST((10000 * COALESCE(p.d20, 0))
            // GREATEST(COALESCE(p.n20, 0), 1) AS BIGINT) AS dup20_bp,
       CAST((10000 * COALESCE(p.d40, 0))
            // GREATEST(COALESCE(p.n40, 0), 1) AS BIGINT) AS dup40_bp,
       CAST(CASE WHEN COALESCE(p.d40, 0) > 0 THEN 40
                 WHEN COALESCE(p.d20, 0) > 0 THEN 20
                 WHEN COALESCE(p.d10, 0) > 0 THEN 10
                 ELSE 0 END AS BIGINT) AS max_dup_len
FROM documents d LEFT JOIN p USING (doc_id)
""",
    tags=("L2", "L4"),
)
def l2_suffix_array_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-resolution duplicate-span profile — the suffix-array question
    ("what is the LONGEST span of this document duplicated anywhere in
    the corpus?") answered by doubling levels n ∈ {10, 20, 40} in ONE
    corpus pass, the way Lee et al.'s 50-token threshold is applied
    without building a distributed suffix array. Per document: the
    duplicated-position share at each resolution (basis points) and
    max_dup_len, the largest level with any corpus-wide duplicate (a
    40-gram duplicate implies memorization risk no 10-gram filter
    grades). Scale shape: all three levels explode inside one map-side
    transform as (level, xxhash64(span)) — 8-byte digests shuffle, span
    text dies in its task (the l2_duplicate_spans trade, collision odds
    2^-64/pair); one groupBy(level, digest) + one groupBy(doc) regardless
    of level count. Oracle recomputes all three levels from span TEXT."""
    t = tokens(F.col("text"))

    def spans(n: int):
        npos = F.size(t) - F.lit(n - 1)
        pos = F.when(npos >= 1, F.sequence(F.lit(1), npos)).otherwise(
            F.expr("CAST(array() AS ARRAY<INT>)")
        )
        return F.transform(
            pos,
            lambda i: F.struct(
                F.lit(n).alias("lvl"),
                F.xxhash64(F.concat_ws(" ", F.slice(t, i, n))).alias("h"),
            ),
        )

    d = T(spark, sf_dir, "documents")
    w = d.select(
        "doc_id",
        F.explode(F.concat(spans(10), spans(20), spans(40))).alias("s"),
    ).select("doc_id", F.col("s.lvl").alias("lvl"), F.col("s.h").alias("h"))
    c = w.groupBy("lvl", "h").agg(F.count(F.lit(1)).alias("c"))
    lv = lambda n: (F.col("lvl") == n).cast("long")  # noqa: E731
    dup = lambda n: ((F.col("lvl") == n) & (F.col("c") >= 2)).cast("long")  # noqa: E731
    p = (
        w.join(c, ["lvl", "h"])
        .groupBy("doc_id")
        .agg(
            F.sum(lv(10)).alias("n10"),
            F.sum(dup(10)).alias("d10"),
            F.sum(lv(20)).alias("n20"),
            F.sum(dup(20)).alias("d20"),
            F.sum(lv(40)).alias("n40"),
            F.sum(dup(40)).alias("d40"),
        )
    )
    bp = lambda dd, nn: F.expr(  # noqa: E731
        f"CAST((10000 * COALESCE({dd}, 0)) DIV GREATEST(COALESCE({nn}, 0), 1) AS BIGINT)"
    )
    return (
        d.select("doc_id")
        .join(p, "doc_id", "left")
        .select(
            "doc_id",
            bp("d10", "n10").alias("dup10_bp"),
            bp("d20", "n20").alias("dup20_bp"),
            bp("d40", "n40").alias("dup40_bp"),
            F.when(F.coalesce("d40", F.lit(0)) > 0, F.lit(40))
            .when(F.coalesce("d20", F.lit(0)) > 0, F.lit(20))
            .when(F.coalesce("d10", F.lit(0)) > 0, F.lit(10))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("max_dup_len"),
        )
    )


@register(
    "l4_robots_policy_filter",
    oracle="""
WITH pol AS (
  -- deterministic per-source policy: md5 first hex char parity (engine-
  -- exact): even -> 'allow', odd -> 'no-train'; license overlay: sources
  -- ending in an even digit also grant 'attribution'
  SELECT DISTINCT source,
         CASE WHEN strpos('0123456789abcdef', substr(md5(source), 1, 1)) % 2
                   = 1
              THEN 'allow' ELSE 'no-train' END AS policy
  FROM documents),
d AS (
  SELECT doc_id, source,
         len(list_filter(string_split(text, ' '), t -> t != '')) AS n_tokens
  FROM documents)
SELECT d.source,
       pol.policy,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN pol.policy = 'allow' THEN d.n_tokens ELSE 0 END)
            AS BIGINT) AS retained_tokens,
       CAST(SUM(CASE WHEN pol.policy = 'no-train' THEN d.n_tokens ELSE 0 END)
            AS BIGINT) AS excluded_tokens
FROM d JOIN pol USING (source)
GROUP BY 1, 2
""",
    tags=("L4", "J2"),
)
def l4_robots_policy_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-level compliance gate (the robots.txt / opt-out register of
    a crawl pipeline): a per-SOURCE policy table — here derived
    deterministically from md5(source) parity so both engines agree;
    in production the register is an ingested table — broadcast-joins
    the corpus and splits the token budget into retained vs excluded.
    Complements l4_blocklist_filter (content-based): this gate is
    PROVENANCE-based — a source flips to no-train and every document it
    contributed leaves the next training set, token-accounted. Scale
    shape: the policy side is |sources| rows (broadcast), the corpus
    side one projected scan; md5-hex-parity parses the same on both
    engines (the established bucket-hash recipe)."""
    d = T(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(F.filter(F.split("text", " "), lambda t: t != F.lit(""))).alias(
            "n_tokens"
        ),
    )
    # strpos-parity: position (1-based) of the first md5 hex char in the
    # hex alphabet — odd position == even hex value == 'allow'
    parity = (
        F.expr(
            "instr('0123456789abcdef', substring(md5(source), 1, 1)) % 2"
        )
        == 1
    )
    pol = (
        d.select("source")
        .distinct()
        .select(
            "source",
            F.when(parity, F.lit("allow")).otherwise(F.lit("no-train")).alias("policy"),
        )
    )
    return (
        d.join(F.broadcast(pol), "source")
        .groupBy("source", "policy")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("policy") == "allow", F.col("n_tokens")).otherwise(0))
            .cast("long")
            .alias("retained_tokens"),
            F.sum(
                F.when(F.col("policy") == "no-train", F.col("n_tokens")).otherwise(0)
            )
            .cast("long")
            .alias("excluded_tokens"),
        )
    )


_RRF_SQL = """
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
pairs AS (
  SELECT e.vec_id,
         CAST(unnest(e.embedding) AS DOUBLE) AS x,
         CAST(unnest((SELECT qv FROM q)) AS DOUBLE) AS y
  FROM embeddings e WHERE e.vec_id != 0),
agg AS (
  SELECT vec_id,
         ROUND(SUM(x * y) / (SQRT(SUM(x * x)) * SQRT(SUM(y * y))), 6) AS cs,
         ROUND(SUM((x - y) * (x - y)), 6) AS d2
  FROM pairs GROUP BY vec_id),
r1 AS (
  SELECT vec_id, ROW_NUMBER() OVER (ORDER BY cs DESC, vec_id) AS rnk
  FROM agg QUALIFY rnk <= 50),
r2 AS (
  SELECT vec_id, ROW_NUMBER() OVER (ORDER BY d2 ASC, vec_id) AS rnk
  FROM agg QUALIFY rnk <= 50),
fused AS (
  SELECT COALESCE(r1.vec_id, r2.vec_id) AS vec_id,
         COALESCE(1.0 / (60 + r1.rnk), 0.0) + COALESCE(1.0 / (60 + r2.rnk), 0.0) AS rrf,
         COALESCE(r1.rnk, -1) AS cos_rank,
         COALESCE(r2.rnk, -1) AS l2_rank
  FROM r1 FULL OUTER JOIN r2 ON r1.vec_id = r2.vec_id)
SELECT vec_id, rrf, CAST(cos_rank AS BIGINT) AS cos_rank, CAST(l2_rank AS BIGINT) AS l2_rank
FROM fused
ORDER BY rrf DESC, vec_id
LIMIT 10
"""


@register("l6_rrf_fusion", oracle=_RRF_SQL, tags=("L3", "L6", "W1", "J4"), doc="")
def l6_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. — the standard hybrid-
    retrieval combiner, what Elasticsearch/Vespa/LanceDB ship as `rrf`):
    two retrievers rank the corpus for one query — cosine similarity and
    (negative) squared L2, genuinely different metrics with different
    orderings — and the fused score is Σ 1/(60+rank) over the lists a
    document appears in (top-50 each), so agreement beats any single
    ranker's confidence. Rank determinism across engines: ranks are
    ROW_NUMBER over ROUND(score, 6) with id tie-break, so a last-ulp
    score divergence can't swap ranks; the fused score is then pure
    integer-derived IEEE arithmetic — bit-identical on both engines. At
    100 TB each ranking is one scan + one WindowGroupLimit'd top-k (no
    global sort of the corpus), and the fusion joins two 50-row lists."""
    from pyspark.sql import Window

    e = T(spark, sf_dir, "embeddings")
    qvec = e.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    q = F.lit([float(x) for x in qvec])
    x = F.transform(F.col("embedding"), lambda v: v.cast("double"))
    y = F.transform(q, lambda v: v.cast("double"))
    dot = F.aggregate(F.zip_with(x, y, lambda a, b: a * b), F.lit(0.0), lambda s, v: s + v)
    nx = F.sqrt(F.aggregate(F.transform(x, lambda a: a * a), F.lit(0.0), lambda s, v: s + v))
    ny = F.sqrt(F.aggregate(F.transform(y, lambda a: a * a), F.lit(0.0), lambda s, v: s + v))
    d2 = F.aggregate(
        F.zip_with(x, y, lambda a, b: (a - b) * (a - b)), F.lit(0.0), lambda s, v: s + v
    )
    scored = e.filter(F.col("vec_id") != 0).select(
        "vec_id",
        F.round(dot / (nx * ny), 6).alias("cs"),
        F.round(d2, 6).alias("d2"),
    )
    r1 = (
        scored.withColumn(
            "rnk", F.row_number().over(Window.orderBy(F.desc("cs"), F.asc("vec_id")))
        )
        .filter(F.col("rnk") <= 50)
        .select("vec_id", F.col("rnk").cast("long").alias("rnk1"))
    )
    r2 = (
        scored.withColumn(
            "rnk", F.row_number().over(Window.orderBy(F.asc("d2"), F.asc("vec_id")))
        )
        .filter(F.col("rnk") <= 50)
        .select("vec_id", F.col("rnk").cast("long").alias("rnk2"))
    )
    fused = r1.join(r2, "vec_id", "full_outer").select(
        "vec_id",
        (
            F.coalesce(F.lit(1.0) / (F.lit(60) + F.col("rnk1")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (F.lit(60) + F.col("rnk2")), F.lit(0.0))
        ).alias("rrf"),
        F.coalesce("rnk1", F.lit(-1)).alias("cos_rank"),
        F.coalesce("rnk2", F.lit(-1)).alias("l2_rank"),
    )
    return fused.orderBy(F.desc("rrf"), F.asc("vec_id")).limit(10)


_INTERLEAVE_SQL = """
WITH a AS (
  SELECT doc_id, doc_id // 2 AS rn0 FROM documents WHERE doc_id % 2 = 0),
b AS (
  SELECT doc_id, (doc_id - 1) // 2 AS rn0 FROM documents WHERE doc_id % 2 = 1),
blocks AS (
  SELECT LEAST((SELECT COUNT(*) FROM a) // 2, (SELECT COUNT(*) FROM b)) AS nb),
interleaved AS (
  SELECT (rn0 // 2) * 3 + rn0 % 2 AS pos, 'A' AS corpus, doc_id
  FROM a WHERE rn0 // 2 < (SELECT nb FROM blocks)
  UNION ALL
  SELECT rn0 * 3 + 2 AS pos, 'B' AS corpus, doc_id
  FROM b WHERE rn0 < (SELECT nb FROM blocks))
SELECT CAST(pos AS BIGINT) AS pos, corpus, doc_id FROM interleaved
"""


@register("l7_interleave_datasets", oracle=_INTERLEAVE_SQL, tags=("L7", "O2"), doc="")
def l7_interleave_datasets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 2:1 dataset interleaving (HF `interleave_datasets`
    with first-exhausted stopping): the training stream takes two docs
    of corpus A then one of corpus B, repeating until the constraining
    corpus runs out — how mixture SCHEDULES are materialized once
    sampling weights (l7_mixture_rebalance) are decided. The 100 TB
    point is the formulation: NO global row_number (a single-partition
    window is the classic driver-shaped bottleneck) — each corpus's
    within-corpus rank is pure arithmetic on its dense id (generally:
    a range-partitioned rank with per-partition offsets), so position
    assignment is map-only, zero shuffles, and the cutoff is one
    2-scalar broadcast. In-query asserts pin the contract: positions
    are exactly 0..3·blocks-1 with no gap or collision."""
    d = T(spark, sf_dir, "documents").select("doc_id")
    a = d.filter(F.col("doc_id") % 2 == 0).withColumn(
        "rn0", (F.col("doc_id") / 2).cast("long")
    )
    b = d.filter(F.col("doc_id") % 2 == 1).withColumn(
        "rn0", ((F.col("doc_id") - 1) / 2).cast("long")
    )
    na, nb_ = a.count(), b.count()
    blocks = min(na // 2, nb_)
    ia = a.filter((F.col("rn0") / 2).cast("long") < blocks).select(
        ((F.col("rn0") / 2).cast("long") * 3 + F.col("rn0") % 2).alias("pos"),
        F.lit("A").alias("corpus"),
        "doc_id",
    )
    ib = b.filter(F.col("rn0") < blocks).select(
        (F.col("rn0") * 3 + 2).alias("pos"), F.lit("B").alias("corpus"), "doc_id"
    )
    out = ia.unionAll(ib)
    n, mx, dn = out.agg(
        F.count(F.lit(1)), F.max("pos"), F.countDistinct("pos")
    ).first()
    assert n == 3 * blocks and mx == 3 * blocks - 1 and dn == n, (n, mx, dn)
    return out


_GOPHER_SQL = """
WITH words AS (
  SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents),
feats AS (
  SELECT doc_id, source,
         len(ws) AS n_words,
         length(replace(list_aggregate(ws, 'string_agg', ''), ' ', '')) AS sum_len,
         len(list_filter(ws, w -> w IN ('the', 'a', 'to', 'of', 'and', 'that', 'have', 'with'))) AS n_stop,
         (SELECT MAX(cnt) FROM (SELECT COUNT(*) AS cnt FROM unnest(ws) AS t(w) GROUP BY w)) AS max_word
  FROM words),
rules AS (
  SELECT source,
         CASE WHEN n_words BETWEEN 40 AND 100000 THEN 0 ELSE 1 END AS f_wordcount,
         CASE WHEN 3 * n_words <= sum_len AND sum_len <= 10 * n_words THEN 0 ELSE 1 END AS f_meanlen,
         CASE WHEN n_stop >= 2 THEN 0 ELSE 1 END AS f_stopword,
         CASE WHEN 5 * max_word <= n_words THEN 0 ELSE 1 END AS f_repetition
  FROM feats)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(f_wordcount) AS BIGINT) AS fail_wordcount,
       CAST(SUM(f_meanlen) AS BIGINT) AS fail_meanlen,
       CAST(SUM(f_stopword) AS BIGINT) AS fail_stopword,
       CAST(SUM(f_repetition) AS BIGINT) AS fail_repetition,
       CAST(SUM(CASE WHEN f_wordcount + f_meanlen + f_stopword + f_repetition = 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_all
FROM rules GROUP BY 1
"""


@register("l4_gopher_rules", oracle=_GOPHER_SQL, tags=("L4", "F6"), doc="")
def l4_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher quality rules (Rae et al. 2021, Appendix A — the rule set
    MassiveText/RefinedWeb/Dolma descend from): per-document hard gates
    on word count, mean word length, stop-word presence, and top-word
    repetition, reported as per-rule violation counts plus the
    survive-all count — the triage report a corpus curator reads before
    tokenizing. (Line-level rules — bullets/ellipses — are omitted: the
    synthetic corpus is single-line; cf. l4_boilerplate_removal for the
    segment plane.) Every rule is INTEGER arithmetic (mean-length
    bounds as 3n ≤ Σlen ≤ 10n, repetition as 5·max_word ≤ n) so both
    engines decide each gate identically — no float threshold can sit
    on a boundary. One scan; the only shuffle is the word-histogram
    aggregate inside the higher-order fold (Spark side: map_from/
    aggregate over the split array, still per-row, NO explode shuffle —
    at 100 TB the per-doc histogram stays inside the row)."""
    d = T(spark, sf_dir, "documents")
    ws = F.split(F.col("text"), " ")
    stop = ("the", "a", "to", "of", "and", "that", "have", "with")
    n_words = F.size(ws)
    sum_len = F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
    n_stop = F.size(F.filter(ws, lambda w: w.isin(*stop)))
    # per-doc top-word count WITHOUT exploding: fold the array into a
    # count map, then take the max — per-row work, zero shuffle
    hist = F.aggregate(
        ws,
        F.create_map().cast("map<string,int>"),
        lambda acc, w: F.map_concat(
            F.map_filter(acc, lambda k, _: k != w),
            F.create_map(w, F.coalesce(F.element_at(acc, w), F.lit(0)) + 1),
        ),
    )
    max_word = F.array_max(F.map_values(hist))
    feats = d.select(
        "source",
        n_words.alias("n_words"),
        sum_len.alias("sum_len"),
        n_stop.alias("n_stop"),
        max_word.alias("max_word"),
    )
    rules = feats.select(
        "source",
        F.when(F.col("n_words").between(40, 100000), 0).otherwise(1).alias("f_wordcount"),
        F.when(
            (3 * F.col("n_words") <= F.col("sum_len"))
            & (F.col("sum_len") <= 10 * F.col("n_words")),
            0,
        ).otherwise(1).alias("f_meanlen"),
        F.when(F.col("n_stop") >= 2, 0).otherwise(1).alias("f_stopword"),
        F.when(5 * F.col("max_word") <= F.col("n_words"), 0).otherwise(1).alias("f_repetition"),
    )
    return rules.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("f_wordcount").cast("long").alias("fail_wordcount"),
        F.sum("f_meanlen").cast("long").alias("fail_meanlen"),
        F.sum("f_stopword").cast("long").alias("fail_stopword"),
        F.sum("f_repetition").cast("long").alias("fail_repetition"),
        F.sum(
            (
                F.col("f_wordcount") + F.col("f_meanlen") + F.col("f_stopword") + F.col("f_repetition")
                == 0
            ).cast("int")
        )
        .cast("long")
        .alias("n_pass_all"),
    )


_ANN_RECALL_SQL = """
WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings WHERE vec_id BETWEEN 20 AND 24),
pairs AS (
  SELECT q.q_id, e.vec_id,
         CAST(unnest(e.embedding) AS DOUBLE) AS x,
         CAST(unnest(q.q_vec) AS DOUBLE) AS y
  FROM embeddings e CROSS JOIN q),
agg AS (
  SELECT q_id, vec_id,
         ROUND(SUM(x * y) / (SQRT(SUM(x * x)) * SQRT(SUM(y * y))), 6) AS cs
  FROM pairs GROUP BY q_id, vec_id),
ranked AS (
  SELECT q_id, vec_id, cs,
         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cs DESC, vec_id) AS rnk
  FROM agg)
SELECT q_id, vec_id, cs AS cos_sim, CAST(rnk AS BIGINT) AS rnk
FROM ranked WHERE rnk <= 10
"""


@register("l3_ann_recall_eval", oracle=_ANN_RECALL_SQL, tags=("L3", "L6"), doc="")
def l3_ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN RECALL EVAL — the acceptance test every approximate index must
    pass before it replaces brute force in a retrieval stack: for a
    5-query panel, compute exact brute-force top-10 (the ground truth
    AND this query's hash-checked output) and the IVF answer at
    nprobe=4/8, then assert recall@10 ≥ 60% per panel average in-query.
    The IVF leg exercises the REAL index surface: persisted
    partitioned-by-centroid parquet, driver-side probe selection from
    collected centroids, partition-pruned probe scan. Recall is a SET
    intersection of ids (integer, engine-independent); the ground truth
    ranking is ROUND(cos,6)+id tie-broken so both engines rank
    identically. At 100 TB the eval panel is how you tune nprobe: this
    query IS that harness, one pruned scan per query vector."""
    import tempfile

    from ..operators.similarity import (
        build_ivf_index,
        ivf_topk_indexed,
        seeded_centroids,
        topk_cosine_join,
    )

    e = T(spark, sf_dir, "embeddings")
    qs = e.filter(F.col("vec_id").between(20, 24)).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    # ground truth: exact top-10 per query (one broadcast similarity join)
    from pyspark.sql import Window

    gt = topk_cosine_join(qs, e, k=10, round_to=6).withColumn(
        "rnk",
        F.row_number()
        .over(Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("vec_id")))
        .cast("long"),
    )
    gt = gt.persist()
    gt_sets: dict = {}
    for r in gt.collect():  # 50 rows: the eval panel, not the corpus
        gt_sets.setdefault(r.q_id, set()).add(r.vec_id)

    cents = seeded_centroids(e, c=8)
    idx_path = tempfile.mkdtemp(prefix="rdl_annrecall_") + "/ivf"
    build_ivf_index(e, cents, idx_path)
    cent_rows = [(r.centroid_id, r.centroid_vec) for r in cents.collect()]
    hits = total = 0
    for q_id, qset in sorted(gt_sets.items()):
        qvec = [float(x) for x in e.filter(F.col("vec_id") == q_id).head()[1]]
        got = {
            r.vec_id
            for r in ivf_topk_indexed(
                spark, idx_path, cent_rows, qvec, k=10, nprobe=4
            ).collect()
        }
        hits += len(got & qset)
        total += len(qset)
    assert total == 50 and hits / total >= 0.6, (hits, total)
    return gt


_KAPPA_SQL = """
WITH words AS (
  SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents),
feats AS (
  SELECT doc_id, source, len(ws) AS n_words,
         len(list_filter(ws, w -> w IN ('the', 'a', 'to', 'of', 'and', 'that', 'have', 'with'))) AS n_stop,
         (SELECT MAX(cnt) FROM (SELECT COUNT(*) AS cnt FROM unnest(ws) AS t(w) GROUP BY w)) AS max_word
  FROM words),
judged AS (
  SELECT source,
         CASE WHEN n_stop * 25 >= n_words THEN 1 ELSE 0 END AS ja,
         CASE WHEN 6 * max_word <= n_words THEN 1 ELSE 0 END AS jb
  FROM feats),
conf AS (
  SELECT source,
         CAST(SUM(ja * jb) AS BIGINT) AS n11,
         CAST(SUM(ja * (1 - jb)) AS BIGINT) AS n10,
         CAST(SUM((1 - ja) * jb) AS BIGINT) AS n01,
         CAST(SUM((1 - ja) * (1 - jb)) AS BIGINT) AS n00
  FROM judged GROUP BY 1)
SELECT source, n11, n10, n01, n00,
       CAST(FLOOR(
         CASE WHEN (n11 + n10 + n01 + n00) * (n11 + n10 + n01 + n00)
                   = ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00))
              THEN 1000000.0
              ELSE ((CAST(n11 + n00 AS DOUBLE) * (n11 + n10 + n01 + n00)
                     - (CAST(n11 + n10 AS DOUBLE) * (n11 + n01)
                        + CAST(n01 + n00 AS DOUBLE) * (n10 + n00)))
                    / (CAST(n11 + n10 + n01 + n00 AS DOUBLE) * (n11 + n10 + n01 + n00)
                       - (CAST(n11 + n10 AS DOUBLE) * (n11 + n01)
                          + CAST(n01 + n00 AS DOUBLE) * (n10 + n00)))) * 1000000
         END) AS BIGINT) AS kappa_q6
FROM conf
"""


@register("l6_judge_agreement", oracle=_KAPPA_SQL, tags=("L6", "A6"), doc="")
def l6_judge_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between two automatic quality JUDGES — the
    agreement statistic every LLM-judge / classifier-ensemble pipeline
    reports before trusting a single filter (raw accuracy flatters
    judges that both say 'keep' to everything; kappa subtracts
    chance-level agreement). Judge A = stop-word density ≥ 4%; judge B =
    top-word repetition ≤ 1/6 — genuinely different signals over the
    same docs. The 2×2 confusion is pure integer aggregation; kappa is
    computed from those integers in one closed form with the
    denominator cleared of division-before-subtraction ((po−pe)/(1−pe)
    scaled by n²) and QUANTIZED floor(·1e6) — the same libm/boundary
    discipline as x_psi_drift; the degenerate pe=1 case pins to 1. One
    scan, per-row higher-order folds, a 20-row reduce."""
    d = T(spark, sf_dir, "documents")
    ws = F.split(F.col("text"), " ")
    stop = ("the", "a", "to", "of", "and", "that", "have", "with")
    n_words = F.size(ws)
    n_stop = F.size(F.filter(ws, lambda w: w.isin(*stop)))
    hist = F.aggregate(
        ws,
        F.create_map().cast("map<string,int>"),
        lambda acc, w: F.map_concat(
            F.map_filter(acc, lambda k, _: k != w),
            F.create_map(w, F.coalesce(F.element_at(acc, w), F.lit(0)) + 1),
        ),
    )
    judged = d.select(
        "source",
        F.when(n_stop * 25 >= n_words, 1).otherwise(0).alias("ja"),
        F.when(6 * F.array_max(F.map_values(hist)) <= n_words, 1).otherwise(0).alias("jb"),
    )
    conf = judged.groupBy("source").agg(
        F.sum(F.col("ja") * F.col("jb")).cast("long").alias("n11"),
        F.sum(F.col("ja") * (1 - F.col("jb"))).cast("long").alias("n10"),
        F.sum((1 - F.col("ja")) * F.col("jb")).cast("long").alias("n01"),
        F.sum((1 - F.col("ja")) * (1 - F.col("jb"))).cast("long").alias("n00"),
    )
    n = F.col("n11") + F.col("n10") + F.col("n01") + F.col("n00")
    pe_num = (F.col("n11") + F.col("n10")) * (F.col("n11") + F.col("n01")) + (
        F.col("n01") + F.col("n00")
    ) * (F.col("n10") + F.col("n00"))
    po_num = (F.col("n11") + F.col("n00")).cast("double") * n
    kappa = (po_num - pe_num.cast("double")) / (
        n.cast("double") * n - pe_num.cast("double")
    )
    return conf.select(
        "source",
        "n11",
        "n10",
        "n01",
        "n00",
        F.when(n * n == pe_num, F.lit(1000000))
        .otherwise(F.floor(kappa * 1000000))
        .cast("long")
        .alias("kappa_q6"),
    )


_ECE_SQL = """
WITH scored AS (
  SELECT doc_id,
         CAST(LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
                              x -> x IN ('spark','hash','merge','join',
                                         'filter','agg','batch','query')))
              AS BIGINT) AS hits,
         CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS toks,
         CASE WHEN n_chars > 200 AND text LIKE '%spark%' THEN 1 ELSE 0 END AS label
  FROM documents),
binned AS (
  SELECT LEAST(CAST(FLOOR(10.0 * hits / toks) AS BIGINT), 9) AS bin,
         CAST(FLOOR(10000.0 * hits / toks) AS BIGINT) AS score_e4,
         label
  FROM scored WHERE toks > 0)
SELECT bin,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(score_e4) AS BIGINT) AS conf_mass_e4,
       CAST(SUM(label) AS BIGINT) AS n_pos,
       CAST(ABS(SUM(score_e4) - 10000 * SUM(label)) AS BIGINT) AS gap_mass_e4
FROM binned GROUP BY 1
"""


@register("l6_calibration_ece", oracle=_ECE_SQL, tags=("L6", "A6"), doc="")
def l6_calibration_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier CALIBRATION audit (Expected Calibration Error — the
    reliability diagram behind every quality-filter threshold choice):
    a filter whose score 0.8 is right 50% of the time silently skews
    the training mixture, so before trusting a score as a sampling
    weight the pipeline bins predictions by confidence and compares
    each bin's confidence mass against its realized positive rate;
    ECE = sum(gap_mass)/N. Scores here are the keyword-density
    classifier (codey-token hits / tokens), labels the deterministic
    relevance proxy. Determinism at 100 TB: every quantity is INTEGER
    (hit/token counts; score quantized to e4 by flooring a per-row
    IEEE-identical division), so the shuffle-order-sensitive float
    summation problem never arises — the whole audit is one
    partial-aggregated groupBy over 10 bins. The in-pipeline use:
    gap_mass_e4 per bin feeds a recalibration map (isotonic or
    per-bin scaling) applied as a broadcast join."""
    codey = ("spark", "hash", "merge", "join", "filter", "agg", "batch", "query")
    d = T(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    scored = d.select(
        F.size(F.filter(toks, lambda x: x.isin(*codey))).cast("bigint").alias("hits"),
        F.size(toks).cast("bigint").alias("toks"),
        (
            (F.col("n_chars") > 200) & F.col("text").contains("spark")
        ).cast("int").alias("label"),
    ).filter(F.col("toks") > 0)
    binned = scored.select(
        F.least(
            F.floor(F.lit(10.0) * F.col("hits") / F.col("toks")).cast("bigint"), F.lit(9)
        ).alias("bin"),
        F.floor(F.lit(10000.0) * F.col("hits") / F.col("toks")).cast("bigint").alias(
            "score_e4"
        ),
        "label",
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("score_e4").cast("bigint").alias("conf_mass_e4"),
        F.sum("label").cast("bigint").alias("n_pos"),
        F.abs(F.sum("score_e4") - F.lit(10000) * F.sum("label"))
        .cast("bigint")
        .alias("gap_mass_e4"),
    )


_SFT_MASK_SQL = """
WITH halves AS (
  SELECT lang,
         ARRAY_TO_STRING(LIST_SLICE(STRING_SPLIT(text, ' '), 1,
                         CAST(LEN(STRING_SPLIT(text, ' ')) // 2 AS INT)), ' ')
           AS prompt,
         ARRAY_TO_STRING(LIST_SLICE(STRING_SPLIT(text, ' '),
                         CAST(LEN(STRING_SPLIT(text, ' ')) // 2 + 1 AS INT),
                         CAST(LEN(STRING_SPLIT(text, ' ')) AS INT)), ' ')
           AS response
  FROM documents
  WHERE LEN(STRING_SPLIT(text, ' ')) >= 2),
spans AS (
  SELECT lang,
         8 + LEN(prompt) + 13 AS active_start,
         LEN(response) AS active_chars,
         8 + LEN(prompt) + 13 + LEN(response) AS total_chars
  FROM halves)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(total_chars) AS BIGINT) AS total_chars,
       CAST(SUM(active_chars) AS BIGINT) AS active_chars,
       CAST(SUM(total_chars - active_chars) AS BIGINT) AS masked_chars,
       CAST(SUM(active_start) AS BIGINT) AS start_checksum,
       CAST(SUM(FLOOR(10000.0 * active_chars / total_chars)) AS BIGINT)
         AS ratio_mass_e4
FROM spans GROUP BY 1
"""


@register("l7_sft_loss_mask", oracle=_SFT_MASK_SQL, tags=("L7", "F1"), doc="")
def l7_sft_loss_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SFT LOSS-MASK span computation (chat-template assembly — the
    last prep step before supervised fine-tuning): each document splits
    into a prompt half and a response half, renders through a chat
    template (`<|user|>…<|assistant|>…`), and the trainer needs the
    ACTIVE span — loss flows only over response characters, never the
    prompt or template scaffolding (masking them is the difference
    between a model that answers and one that parrots questions back).
    Emitted per language: active/masked char masses, the active-span
    START offsets (checksummed — this is the actual tensor the collator
    consumes), and the floor-quantized active-ratio mass that mixture
    tuning reads. Everything is INTEGER arithmetic over split/slice/
    join column ops — JVM-side, shuffle-free until the per-lang reduce;
    the template literals' lengths (8 and 13) enter the offsets exactly
    as the tokenizer-side collator would see them. Cf. l7_chunking
    (span packing) and l7_sequence_packing — this adds the
    template/mask leg of the SFT data path."""
    d = T(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    n = F.size(words)
    k = F.floor(n / 2).cast("int")
    halves = d.filter(n >= 2).select(
        "lang",
        F.array_join(F.slice(words, 1, k), " ").alias("prompt"),
        F.array_join(F.slice(words, k + 1, n - k), " ").alias("response"),
    )
    spans = halves.select(
        "lang",
        (F.lit(8) + F.length("prompt") + F.lit(13)).alias("active_start"),
        F.length("response").alias("active_chars"),
        (F.lit(8) + F.length("prompt") + F.lit(13) + F.length("response")).alias(
            "total_chars"
        ),
    )
    return spans.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("total_chars").cast("bigint").alias("total_chars"),
        F.sum("active_chars").cast("bigint").alias("active_chars"),
        F.sum(F.col("total_chars") - F.col("active_chars")).cast("bigint").alias(
            "masked_chars"
        ),
        F.sum("active_start").cast("bigint").alias("start_checksum"),
        F.sum(
            F.floor(F.lit(10000.0) * F.col("active_chars") / F.col("total_chars"))
        ).cast("bigint").alias("ratio_mass_e4"),
    )


_BQ_SQL = """
WITH ex AS (
  SELECT vec_id, UNNEST(embedding) AS x, UNNEST(RANGE(1, 65)) AS i
  FROM embeddings),
words AS (
  SELECT vec_id,
         CAST(SUM(CASE WHEN x > 0 AND i <= 32
                       THEN CAST(1 AS BIGINT) << (i - 1) ELSE 0 END) AS BIGINT) AS w0,
         CAST(SUM(CASE WHEN x > 0 AND i > 32
                       THEN CAST(1 AS BIGINT) << (i - 33) ELSE 0 END) AS BIGINT) AS w1
  FROM ex GROUP BY 1),
q AS (SELECT w0 AS qw0, w1 AS qw1 FROM words WHERE vec_id = 0)
SELECT w.vec_id,
       CAST(BIT_COUNT(XOR(w.w0, q.qw0)) + BIT_COUNT(XOR(w.w1, q.qw1)) AS BIGINT)
         AS hamming
FROM words w, q
ORDER BY hamming, vec_id
LIMIT 20
"""


@register("l3_binary_quantization", oracle=_BQ_SQL, tags=("L3",), doc="")
def l3_binary_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BINARY quantization ANN (sign-bit embeddings + Hamming distance —
    the 32x-compression rerank pipeline current vector stores ship as
    'BQ'): each 64-dim embedding collapses to 64 SIGN BITS packed into
    two 32-bit words (disjoint powers sum exactly in int64 — bit 63 of
    a single word would overflow signed math on both engines, which is
    why the split exists), and candidate generation is
    popcount(xor(words)) — pure integer column math, so unlike every
    float-scored ANN variant the ORACLE here is exact end to end, no
    rounding escape hatch. Top-20 by (hamming, vec_id) is totally
    ordered. The in-query assert runs the exact-cosine top-20 on the
    SAME data and pins BQ recall >= 25%% — the sign bits genuinely
    carry signal, this is not a checksum of noise. At 100 TB: the
    packed index is 16 bytes/vector (fits broadcast at million-vector
    scale), Hamming scans vectorize JVM-side, and the float path runs
    only on the rerank candidates — the standard BQ contract. Cf.
    l3_sq8_topk (8-bit scalar), l3_pq_topk (codebooks), hyperplane LSH
    (random projections; BQ is LSH with axis-aligned planes)."""
    e = T(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    w0 = F.expr(
        "aggregate(transform(sequence(0, 31), i -> IF(embedding[i] > 0D,"
        " shiftleft(1L, i), 0L)), 0L, (a, x) -> a + x)"
    )
    w1 = F.expr(
        "aggregate(transform(sequence(32, 63), i -> IF(embedding[i] > 0D,"
        " shiftleft(1L, i - 32), 0L)), 0L, (a, x) -> a + x)"
    )
    words = e.select("vec_id", w0.alias("w0"), w1.alias("w1"))
    q = words.filter(F.col("vec_id") == 0).select(
        F.col("w0").alias("qw0"), F.col("w1").alias("qw1")
    )
    scored = words.crossJoin(F.broadcast(q)).select(
        "vec_id",
        (
            F.bit_count(F.col("w0").bitwiseXOR(F.col("qw0")))
            + F.bit_count(F.col("w1").bitwiseXOR(F.col("qw1")))
        )
        .cast("bigint")
        .alias("hamming"),
    )
    top = scored.orderBy("hamming", "vec_id").limit(20)
    # recall check vs exact cosine on the same data (engine-side only)
    qv = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    cos = (
        e.crossJoin(F.broadcast(qv))
        .select(
            "vec_id",
            (
                F.aggregate(
                    F.zip_with("embedding", "qv", lambda a, b: a * b),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                / (
                    F.sqrt(
                        F.aggregate(
                            F.zip_with("embedding", "embedding", lambda a, b: a * b),
                            F.lit(0.0),
                            lambda acc, x: acc + x,
                        )
                    )
                    * F.sqrt(
                        F.aggregate(
                            F.zip_with("qv", "qv", lambda a, b: a * b),
                            F.lit(0.0),
                            lambda acc, x: acc + x,
                        )
                    )
                )
            ).alias("cs"),
        )
        .orderBy(F.desc("cs"), "vec_id")
        .limit(20)
    )
    exact_ids = {r["vec_id"] for r in cos.collect()}
    bq_ids = {r["vec_id"] for r in top.collect()}
    overlap = len(exact_ids & bq_ids)
    assert overlap >= 5, f"BQ recall collapsed: {overlap}/20"
    return top


_READABILITY_SQL = """
WITH m AS (
  SELECT lang,
         CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS words,
         CAST(LEN(REGEXP_EXTRACT_ALL(text, '[aeiouy]+')) AS BIGINT) AS syllables,
         CAST(GREATEST(LEN(REGEXP_EXTRACT_ALL(text, '[.!?]')), 1) AS BIGINT)
           AS sentences
  FROM documents),
scored AS (
  SELECT lang, words, syllables, sentences,
         CAST(FLOOR(100.0 * (206.835
                    - 1.015 * (CAST(words AS DOUBLE) / sentences)
                    - 84.6 * (CAST(syllables AS DOUBLE) / words))) AS BIGINT)
           AS flesch_e2
  FROM m WHERE words > 0)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(words) AS BIGINT) AS total_words,
       CAST(SUM(syllables) AS BIGINT) AS total_syllables,
       CAST(SUM(flesch_e2) AS BIGINT) AS flesch_mass_e2,
       CAST(COUNT(*) FILTER (WHERE flesch_e2 < 3000) AS BIGINT) AS n_hard_docs
FROM scored GROUP BY 1
"""


@register("l4_readability", oracle=_READABILITY_SQL, tags=("L4",), doc="")
def l4_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """READABILITY scoring (Flesch Reading Ease — the named formula
    behind "grade level" corpus filters; C4 and friends gate on
    adjacent heuristics): 206.835 - 1.015*(words/sentence) -
    84.6*(syllables/word), with syllables approximated by VOWEL-GROUP
    counting ([aeiouy]+ runs — the standard cheap estimator) and
    sentence count floored at 1 (fragments still score). All three
    inputs are INTEGER regex/split counts; the two ratios divide
    identical exact integers (IEEE-identical doubles), and the score is
    floor-quantized to centipoints BEFORE the per-language sum, so no
    float mass accumulates. The filter leg (n_hard_docs: score < 30 =
    'very difficult') is the gate a curriculum or quality mixture would
    consume. One map-side pass, per-language reduce; regex cost scales
    with corpus bytes — the same scan l4_text_stats already pays, where
    this would ride as extra columns in production."""
    d = T(spark, sf_dir, "documents")
    words = F.size(F.split(F.col("text"), " ")).cast("bigint")
    syll = F.size(F.regexp_extract_all("text", F.lit("[aeiouy]+"), 0)).cast("bigint")
    sents = F.greatest(
        F.size(F.regexp_extract_all("text", F.lit("[.!?]"), 0)).cast("bigint"), F.lit(1)
    )
    m = d.select("lang", words.alias("words"), syll.alias("syllables"), sents.alias("sentences"))
    flesch = F.floor(
        F.lit(100.0)
        * (
            F.lit(206.835)
            - F.lit(1.015) * (F.col("words").cast("double") / F.col("sentences"))
            - F.lit(84.6) * (F.col("syllables").cast("double") / F.col("words"))
        )
    ).cast("bigint")
    scored = m.filter(F.col("words") > 0).withColumn("flesch_e2", flesch)
    return scored.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("words").cast("bigint").alias("total_words"),
        F.sum("syllables").cast("bigint").alias("total_syllables"),
        F.sum("flesch_e2").cast("bigint").alias("flesch_mass_e2"),
        F.sum((F.col("flesch_e2") < 3000).cast("int")).cast("bigint").alias("n_hard_docs"),
    )


_PASS_AT_K_SQL = """
WITH tasks AS (
  SELECT o_orderpriority AS priority,
         CAST(YEAR(CAST(o_orderdate AS DATE)) AS INT) AS yr,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COUNT(*) FILTER (WHERE o_orderkey % 4 = 0) AS BIGINT) AS c
  FROM orders GROUP BY 1, 2),
est AS (
  SELECT priority, n, c,
         CAST(FLOOR(1000000.0 * CAST(c AS DOUBLE) / n) AS BIGINT) AS pass1_e6,
         CASE WHEN n - c >= 5 THEN
           CAST(FLOOR(1000000.0 * (1.0 -
             CAST(n - c - 0 AS DOUBLE) / (n - 0)
             * (CAST(n - c - 1 AS DOUBLE) / (n - 1))
             * (CAST(n - c - 2 AS DOUBLE) / (n - 2))
             * (CAST(n - c - 3 AS DOUBLE) / (n - 3))
             * (CAST(n - c - 4 AS DOUBLE) / (n - 4)))) AS BIGINT)
         ELSE 1000000 END AS pass5_e6
  FROM tasks WHERE n >= 5)
SELECT priority,
       CAST(COUNT(*) AS BIGINT) AS n_tasks,
       CAST(SUM(pass1_e6) AS BIGINT) AS pass1_mass_e6,
       CAST(SUM(pass5_e6) AS BIGINT) AS pass5_mass_e6,
       CAST(COUNT(*) FILTER (WHERE c = n) AS BIGINT) AS n_saturated
FROM est GROUP BY 1
"""


@register("l6_pass_at_k", oracle=_PASS_AT_K_SQL, tags=("L6",), doc="")
def l6_pass_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pass@k (the UNBIASED estimator from the HumanEval/Codex paper —
    Chen et al. 2021, eq. 1: 1 - C(n-c,k)/C(n,k)): THE metric for
    sampled code/reasoning evals, and famously miscomputed by the
    naive 1-(1-c/n)^k plug-in. The binomial ratio telescopes into
    k exact-integer fractions — Π (n-c-i)/(n-i), i<k — unrolled here
    literally (k=5), left-associated, each factor an IEEE division of
    exact integers, so both engines walk the identical float sequence
    and the floor-e6 quantization can never straddle. Degenerate cases
    pinned: n-c < k means some k-subset must contain a pass (pass@k=1,
    the CASE guard — exactly where the plug-in formula is most wrong),
    saturated tasks (c=n) counted. One partial-agg pass builds per-task
    (n, c); the estimator runs on the tiny task grid. In a real eval
    pipeline the samples are model generations and `correct` is a test
    harness verdict — the shape is identical."""
    o = T(spark, sf_dir, "orders")
    tasks = o.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.year(F.col("o_orderdate").cast("date")).cast("int").alias("yr"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("o_orderkey") % 4 == 0).cast("int")).cast("bigint").alias("c"),
    ).filter(F.col("n") >= 5)
    n, c = F.col("n"), F.col("c")
    prod = (
        ((n - c - 0).cast("double") / (n - 0))
        * ((n - c - 1).cast("double") / (n - 1))
        * ((n - c - 2).cast("double") / (n - 2))
        * ((n - c - 3).cast("double") / (n - 3))
        * ((n - c - 4).cast("double") / (n - 4))
    )
    est = tasks.select(
        "priority",
        "n",
        "c",
        F.floor(F.lit(1000000.0) * c.cast("double") / n).cast("bigint").alias("pass1_e6"),
        F.when(
            n - c >= 5,
            F.floor(F.lit(1000000.0) * (F.lit(1.0) - prod)).cast("bigint"),
        )
        .otherwise(F.lit(1000000))
        .alias("pass5_e6"),
    )
    return est.groupBy("priority").agg(
        F.count(F.lit(1)).alias("n_tasks"),
        F.sum("pass1_e6").cast("bigint").alias("pass1_mass_e6"),
        F.sum("pass5_e6").cast("bigint").alias("pass5_mass_e6"),
        F.sum((F.col("c") == F.col("n")).cast("int")).cast("bigint").alias("n_saturated"),
    )


_FILTERED_TOPK_SQL = """
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT e.vec_id, e.label,
         CAST(UNNEST(e.embedding) AS DOUBLE) AS x,
         CAST(UNNEST((SELECT qv FROM q)) AS DOUBLE) AS y
  FROM embeddings e
  WHERE e.label IN (2, 5, 7)),
agg AS (
  SELECT vec_id, label,
         SUM(x * y) / (SQRT(SUM(x * x)) * SQRT(SUM(y * y))) AS cs
  FROM scored GROUP BY 1, 2)
SELECT vec_id, CAST(label AS BIGINT) AS label, ROUND(cs, 6) AS cos_sim
FROM agg
ORDER BY cos_sim DESC, vec_id
LIMIT 10
"""


@register("l3_filtered_topk", oracle=_FILTERED_TOPK_SQL, tags=("L3", "P2"), doc="")
def l3_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTERED vector search (metadata predicate + ANN — the feature
    current vector stores market hardest, because a post-filtered index
    probe silently returns FEWER than k when the filter is selective):
    top-10 cosine neighbors among vectors whose label passes the
    predicate. Strategy here is PRE-FILTER: the predicate prunes BEFORE
    scoring — pushed to the parquet scan like any relational filter —
    then exact scoring runs on survivors only, so k results are
    guaranteed and recall is exact by construction. The decision rule
    at scale: pre-filter + brute force when selectivity is high (the
    filter does the heavy lifting; the scan is the cost you were
    already paying), IVF-probe + post-filter + over-fetch when the
    filter is weak (l3_ivf_topk's partition-pruned path with k
    inflated by 1/selectivity). The oracle shares the repo's
    established cosine determinism treatment (ROUND 6, vec_id
    tie-break — l3_topk_cosine's precedent, driver-green since r4)."""
    e = T(spark, sf_dir, "embeddings").filter(F.col("label").isin(2, 5, 7))
    qv = (
        T(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == 0)
        .select(F.col("embedding").alias("qv"))
    )
    dot = F.aggregate(
        F.zip_with("embedding", "qv", lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
    )
    nx = F.sqrt(
        F.aggregate(
            F.zip_with("embedding", "embedding", lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    ny = F.sqrt(
        F.aggregate(
            F.zip_with("qv", "qv", lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
        )
    )
    return (
        e.crossJoin(F.broadcast(qv))
        .select(
            "vec_id",
            F.col("label").cast("bigint").alias("label"),
            F.round(dot / (nx * ny), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), "vec_id")
        .limit(10)
    )


_ROUGE_SQL = """
WITH pairs AS (
  SELECT doc_id AS cand_id, CAST(XOR(doc_id, 1) AS BIGINT) AS ref_id,
         STRING_SPLIT(text, ' ') AS l
  FROM documents),
bg AS (
  SELECT cand_id, ref_id,
         UNNEST(LIST_ZIP(l[1:LEN(l)-1], l[2:LEN(l)])) AS p
  FROM pairs WHERE LEN(l) >= 2),
grams AS (
  SELECT cand_id, ref_id, p[1] || ' ' || p[2] AS g, COUNT(*) AS n
  FROM bg GROUP BY 1, 2, 3),
inter AS (
  SELECT c.cand_id,
         CAST(SUM(LEAST(c.n, r.n)) AS BIGINT) AS overlap
  FROM grams c JOIN grams r
    ON r.cand_id = c.ref_id AND r.g = c.g
  GROUP BY 1),
tot AS (
  SELECT cand_id, CAST(SUM(n) AS BIGINT) AS n_grams FROM grams GROUP BY 1),
scored AS (
  SELECT t.cand_id,
         COALESCE(i.overlap, 0) AS overlap,
         t.n_grams AS cand_grams,
         rt.n_grams AS ref_grams,
         CAST(FLOOR(10000.0 * COALESCE(i.overlap, 0) / t.n_grams) AS BIGINT) AS p_e4,
         CAST(FLOOR(10000.0 * COALESCE(i.overlap, 0) / rt.n_grams) AS BIGINT) AS r_e4
  FROM tot t
  JOIN pairs pr ON pr.cand_id = t.cand_id
  JOIN tot rt ON rt.cand_id = pr.ref_id
  LEFT JOIN inter i ON i.cand_id = t.cand_id)
SELECT CAST(cand_id % 8 AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(overlap) AS BIGINT) AS overlap_mass,
       CAST(SUM(p_e4) AS BIGINT) AS precision_mass_e4,
       CAST(SUM(r_e4) AS BIGINT) AS recall_mass_e4
FROM scored GROUP BY 1
"""


@register("l6_rouge_ngram", oracle=_ROUGE_SQL, tags=("L6", "L4"), doc="")
def l6_rouge_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROUGE-2 n-gram overlap (Lin 2004 — the summarization/eval
    overlap family; same machinery as BLEU's clipped counts): candidate
    and reference pair deterministically (doc_id XOR 1 — adjacent docs
    reference each other symmetrically), each side's bigrams count as a
    MULTISET, and overlap is Σ min(count_cand, count_ref) per gram —
    the clipping that stops a candidate repeating one good bigram from
    gaming precision. Precision/recall quantize at e4 per pair before
    the bucket reduce: every quantity is an integer, so the eval is
    exact cross-engine. Shape: one bigram explode (the l4_bigrams
    lane), one (pair, gram) equi-join — at 100 TB eval scale this is a
    digest-keyed shuffle join, never a per-pair loop; the same plan
    scores a million (candidate, reference) pairs in one pass, which is
    what makes corpus-wide generation eval affordable."""
    d = T(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("cand_id"),
        F.col("doc_id").bitwiseXOR(F.lit(1)).cast("bigint").alias("ref_id"),
        F.split(F.col("text"), " ").alias("l"),
    )
    n = F.size("l")
    bigrams = d.filter(n >= 2).select(
        "cand_id",
        "ref_id",
        F.explode(
            F.zip_with(
                F.slice("l", 1, n - 1),
                F.slice("l", 2, n - 1),
                lambda a, b: F.concat(a, F.lit(" "), b),
            )
        ).alias("g"),
    )
    grams = bigrams.groupBy("cand_id", "ref_id", "g").agg(F.count(F.lit(1)).alias("n"))
    c, r = grams.alias("c"), grams.alias("r")
    inter = (
        c.join(r, (F.col("r.cand_id") == F.col("c.ref_id")) & (F.col("r.g") == F.col("c.g")))
        .groupBy(F.col("c.cand_id").alias("cand_id"))
        .agg(F.sum(F.least(F.col("c.n"), F.col("r.n"))).cast("bigint").alias("overlap"))
    )
    tot = grams.groupBy("cand_id").agg(F.sum("n").cast("bigint").alias("n_grams"))
    pairs = d.select("cand_id", "ref_id")
    scored = (
        tot.join(pairs, "cand_id")
        .join(
            tot.select(F.col("cand_id").alias("ref_id"), F.col("n_grams").alias("ref_grams")),
            "ref_id",
        )
        .join(inter, "cand_id", "left")
        .select(
            "cand_id",
            F.coalesce("overlap", F.lit(0)).alias("overlap"),
            F.floor(
                F.lit(10000.0) * F.coalesce("overlap", F.lit(0)) / F.col("n_grams")
            ).cast("bigint").alias("p_e4"),
            F.floor(
                F.lit(10000.0) * F.coalesce("overlap", F.lit(0)) / F.col("ref_grams")
            ).cast("bigint").alias("r_e4"),
        )
    )
    return scored.groupBy((F.col("cand_id") % 8).cast("bigint").alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("overlap").cast("bigint").alias("overlap_mass"),
        F.sum("p_e4").cast("bigint").alias("precision_mass_e4"),
        F.sum("r_e4").cast("bigint").alias("recall_mass_e4"),
    )


_GINI_SQL = """
WITH counts AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY 1),
ranked AS (
  SELECT n, CAST(ROW_NUMBER() OVER (ORDER BY n, lang) AS BIGINT) AS i FROM counts),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(n) AS BIGINT) AS total,
         CAST(SUM(i * n) AS BIGINT) AS s1
  FROM ranked)
SELECT k, total,
       CAST(FLOOR(1000000.0 * (2.0 * s1 / (k * total) - (k + 1.0) / k)) AS BIGINT)
         AS gini_e6
FROM s
"""


@register("l4_gini_language_balance", oracle=_GINI_SQL, tags=("L4", "L7"), doc="")
def l4_gini_language_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus BALANCE audit via the GINI coefficient (the inequality
    measure dataset cards quote for language/domain skew — 0 = uniform
    mixture, ->1 = one language dominates): computed by the exact
    sorted-rank identity G = 2*Σ(i*x_i)/(k*Σx) - (k+1)/k over per-
    language counts ranked ascending with a (count, lang) total-order
    tie-break. Everything until the final closed form is INTEGER (rank
    index times count), so the floor-e6 result is deterministic
    cross-engine. Shape: one partial-agg count pass over the corpus,
    then the rank/identity runs on k rows (languages). The number a
    mixture-rebalance job (l7_mixture_rebalance) drives to zero."""
    from pyspark.sql import Window

    d = T(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    ranked = counts.select(
        "n",
        F.row_number().over(Window.orderBy("n", "lang")).cast("bigint").alias("i"),
    )
    s = ranked.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n").cast("bigint").alias("total"),
        F.sum(F.col("i") * F.col("n")).cast("bigint").alias("s1"),
    )
    return s.select(
        "k",
        "total",
        F.floor(
            F.lit(1000000.0)
            * (
                F.lit(2.0) * F.col("s1") / (F.col("k") * F.col("total"))
                - (F.col("k") + F.lit(1.0)) / F.col("k")
            )
        )
        .cast("bigint")
        .alias("gini_e6"),
    )


_BLEU_SQL = """
WITH pairs AS (
  SELECT doc_id AS cand_id, CAST(XOR(doc_id, 1) AS BIGINT) AS ref_id,
         STRING_SPLIT(text, ' ') AS l
  FROM documents),
uni AS (
  SELECT cand_id, ref_id, UNNEST(l) AS g FROM pairs),
ug AS (
  SELECT cand_id, ref_id, g, COUNT(*) AS n FROM uni GROUP BY 1, 2, 3),
bg AS (
  SELECT cand_id, ref_id,
         UNNEST(LIST_ZIP(l[1:LEN(l)-1], l[2:LEN(l)])) AS p
  FROM pairs WHERE LEN(l) >= 2),
bgg AS (
  SELECT cand_id, ref_id, p[1] || ' ' || p[2] AS g, COUNT(*) AS n
  FROM bg GROUP BY 1, 2, 3),
ov1 AS (
  SELECT c.cand_id, CAST(SUM(LEAST(c.n, r.n)) AS BIGINT) AS o1
  FROM ug c JOIN ug r ON r.cand_id = c.ref_id AND r.g = c.g GROUP BY 1),
ov2 AS (
  SELECT c.cand_id, CAST(SUM(LEAST(c.n, r.n)) AS BIGINT) AS o2
  FROM bgg c JOIN bgg r ON r.cand_id = c.ref_id AND r.g = c.g GROUP BY 1),
lens AS (
  SELECT cand_id, ref_id, CAST(LEN(l) AS BIGINT) AS n1,
         CAST(GREATEST(LEN(l) - 1, 0) AS BIGINT) AS n2
  FROM pairs),
scored AS (
  SELECT t.cand_id,
         CASE WHEN COALESCE(ov1.o1, 0) = 0 OR COALESCE(ov2.o2, 0) = 0
                   OR t.n2 = 0 THEN 0
              ELSE CAST(FLOOR(10000.0
                * LEAST(1.0, EXP(1.0 - CAST(rl.n1 AS DOUBLE) / t.n1))
                * SQRT((CAST(ov1.o1 AS DOUBLE) / t.n1)
                       * (CAST(ov2.o2 AS DOUBLE) / t.n2))) AS BIGINT)
         END AS bleu_e4
  FROM lens t
  JOIN lens rl ON rl.cand_id = t.ref_id
  LEFT JOIN ov1 ON ov1.cand_id = t.cand_id
  LEFT JOIN ov2 ON ov2.cand_id = t.cand_id)
SELECT CAST(cand_id % 8 AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(bleu_e4) AS BIGINT) AS bleu_mass_e4,
       CAST(MAX(bleu_e4) AS BIGINT) AS bleu_max_e4
FROM scored GROUP BY 1
"""


@register("l6_bleu", oracle=_BLEU_SQL, tags=("L6", "L4"), doc="")
def l6_bleu(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BLEU-2 with brevity penalty (Papineni 2002 — the generation-eval
    complement of l6_rouge_ngram's recall focus): per deterministic
    (candidate, reference) pair (doc_id XOR 1, same symmetric pairing as
    ROUGE), clipped unigram and bigram precisions p₁, p₂ and
    BP = min(1, e^(1−ref_len/cand_len)); score = BP·√(p₁p₂). The
    geometric mean is computed as √(p₁p₂), NOT exp(½Σln pᵢ): sqrt is
    IEEE-correctly-rounded, so identical rationals give identical
    doubles cross-engine with no ln-ulp absorption needed; the one exp
    (BP) is a fixed-arity expression on a rational. Zero n-gram overlap
    scores 0 (no smoothing — pinned convention both sides). e4-floored
    per pair before the bucket reduce keeps the aggregate integer.
    Shape: two gram explodes + two digest-keyed clipped-overlap joins —
    one pass scores every pair, the corpus-scale eval plan."""
    d = T(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("cand_id"),
        F.col("doc_id").bitwiseXOR(F.lit(1)).cast("bigint").alias("ref_id"),
        F.split(F.col("text"), " ").alias("l"),
    )
    n = F.size("l")
    uni = d.select("cand_id", "ref_id", F.explode("l").alias("g"))
    ug = uni.groupBy("cand_id", "ref_id", "g").agg(F.count(F.lit(1)).alias("n"))
    bi = d.filter(n >= 2).select(
        "cand_id",
        "ref_id",
        F.explode(
            F.zip_with(
                F.slice("l", 1, n - 1),
                F.slice("l", 2, n - 1),
                lambda a, b: F.concat(a, F.lit(" "), b),
            )
        ).alias("g"),
    )
    bgg = bi.groupBy("cand_id", "ref_id", "g").agg(F.count(F.lit(1)).alias("n"))

    def clipped(grams, out):
        c, r = grams.alias("c"), grams.alias("r")
        return (
            c.join(
                r,
                (F.col("r.cand_id") == F.col("c.ref_id"))
                & (F.col("r.g") == F.col("c.g")),
            )
            .groupBy(F.col("c.cand_id").alias("cand_id"))
            .agg(F.sum(F.least(F.col("c.n"), F.col("r.n"))).cast("bigint").alias(out))
        )

    lens = d.select(
        "cand_id",
        "ref_id",
        n.cast("bigint").alias("n1"),
        F.greatest(n - 1, F.lit(0)).cast("bigint").alias("n2"),
    )
    rl = lens.select(F.col("cand_id").alias("ref_id"), F.col("n1").alias("rn1"))
    scored = (
        lens.join(rl, "ref_id")
        .join(clipped(ug, "o1"), "cand_id", "left")
        .join(clipped(bgg, "o2"), "cand_id", "left")
        .select(
            "cand_id",
            F.when(
                (F.coalesce("o1", F.lit(0)) == 0)
                | (F.coalesce("o2", F.lit(0)) == 0)
                | (F.col("n2") == 0),
                F.lit(0),
            )
            .otherwise(
                F.floor(
                    F.lit(10000.0)
                    * F.least(
                        F.lit(1.0),
                        F.exp(F.lit(1.0) - F.col("rn1").cast("double") / F.col("n1")),
                    )
                    * F.sqrt(
                        (F.col("o1").cast("double") / F.col("n1"))
                        * (F.col("o2").cast("double") / F.col("n2"))
                    )
                )
            )
            .cast("bigint")
            .alias("bleu_e4"),
        )
    )
    return scored.groupBy((F.col("cand_id") % 8).cast("bigint").alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("bleu_e4").cast("bigint").alias("bleu_mass_e4"),
        F.max("bleu_e4").cast("bigint").alias("bleu_max_e4"),
    )


_ZIPF_SQL = """
WITH tok AS (
  SELECT unnest(list_filter(string_split(text, ' '), t -> t != '')) AS w
  FROM documents),
freq AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS f FROM tok GROUP BY 1),
ranked AS (
  SELECT w, f, ROW_NUMBER() OVER (ORDER BY f DESC, w) AS rnk
  FROM freq),
top AS (
  SELECT CAST(ln(CAST(rnk AS DOUBLE)) AS DECIMAL(18,9)) AS lr,
         CAST(ln(CAST(f AS DOUBLE)) AS DECIMAL(18,9)) AS lf
  FROM ranked WHERE rnk <= 1000),
s AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(lr) AS DOUBLE) AS sx, CAST(SUM(lf) AS DOUBLE) AS sy,
         CAST(SUM(lr * lr) AS DOUBLE) AS sxx,
         CAST(SUM(lf * lf) AS DOUBLE) AS syy,
         CAST(SUM(lr * lf) AS DOUBLE) AS sxy
  FROM top)
SELECT CAST(n AS BIGINT) AS n_tokens,
       CAST(FLOOR(1000000.0 * (n * sxy - sx * sy) / (n * sxx - sx * sx))
            AS BIGINT) AS slope_e6,
       CAST(FLOOR(1000000.0 * (sy - sx * ((n * sxy - sx * sy) / (n * sxx - sx * sx))) / n)
            AS BIGINT) AS intercept_e6,
       CAST(FLOOR(1000000.0 * (n * sxy - sx * sy) * (n * sxy - sx * sy)
                  / ((n * sxx - sx * sx) * (n * syy - sy * sy)))
            AS BIGINT) AS r2_e6
FROM s
"""


@register("l4_zipf_exponent", oracle=_ZIPF_SQL, tags=("L4", "A1"), doc="")
def l4_zipf_exponent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the corpus token frequency spectrum (the
    corpus-health diagnostic: natural text fits ln f ≈ −s·ln r + c with
    s ≈ 1; boilerplate floods, dedup failures, and synthetic spam bend
    the rank-frequency line — so the fitted exponent and its R² are a
    one-number drift alarm for a training corpus): token counts reduce
    to the frequency table, ranks assign under the total order (freq
    desc, token asc), and OLS runs over the top-1000 (ln rank, ln freq)
    points. Determinism uses BOTH house tricks at once: each ln value
    quantizes to DECIMAL(18,9) BEFORE any summation (the
    l2_weighted_jaccard pattern — decimal sums are order-independent),
    and their pairwise products stay exact decimals, so both engines
    reduce identical values in any order; the closed form + floor-e6 is
    the only float step. Plan: one token explode (the corpus pass every
    l4 op shares), one frequency shuffle, a 1000-row grid — the fit
    itself costs nothing at any corpus scale."""
    from pyspark.sql import Window

    tok = T(spark, sf_dir, "documents").select(
        F.explode(F.filter(F.split(F.col("text"), " "), lambda t: t != "")).alias("w")
    )
    freq = tok.groupBy("w").agg(F.count(F.lit(1)).cast("bigint").alias("f"))
    ranked = freq.select(
        "f", F.row_number().over(Window.orderBy(F.desc("f"), "w")).alias("rnk")
    ).where(F.col("rnk") <= 1000)
    top = ranked.select(
        F.log(F.col("rnk").cast("double")).cast("decimal(18,9)").alias("lr"),
        F.log(F.col("f").cast("double")).cast("decimal(18,9)").alias("lf"),
    )
    s = top.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("lr").cast("double").alias("sx"),
        F.sum("lf").cast("double").alias("sy"),
        F.sum(F.col("lr") * F.col("lr")).cast("double").alias("sxx"),
        F.sum(F.col("lf") * F.col("lf")).cast("double").alias("syy"),
        F.sum(F.col("lr") * F.col("lf")).cast("double").alias("sxy"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return s.select(
        F.col("n").cast("bigint").alias("n_tokens"),
        F.floor(F.lit(1000000.0) * slope).cast("bigint").alias("slope_e6"),
        F.floor(F.lit(1000000.0) * (F.col("sy") - F.col("sx") * slope) / F.col("n"))
        .cast("bigint")
        .alias("intercept_e6"),
        F.floor(
            F.lit(1000000.0)
            * (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            * (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (
                (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
                * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
            )
        )
        .cast("bigint")
        .alias("r2_e6"),
    )


_AUC_SQL = """
WITH d AS (
  SELECT source, n_chars AS score,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
  FROM documents),
g AS (
  SELECT source, score,
         CAST(COUNT(*) AS BIGINT) AS cnt,
         CAST(SUM(pos) AS BIGINT) AS np
  FROM d GROUP BY 1, 2),
r AS (
  SELECT source, score, cnt, np,
         CAST(SUM(cnt) OVER (PARTITION BY source ORDER BY score)
              AS BIGINT) - cnt AS cum_before
  FROM g),
s AS (
  SELECT source,
         CAST(SUM(np) AS BIGINT) AS n_pos,
         CAST(SUM(cnt - np) AS BIGINT) AS n_neg,
         CAST(SUM(np * (2 * cum_before + cnt + 1)) AS BIGINT) AS r2_pos
  FROM r GROUP BY 1)
SELECT source, n_pos, n_neg,
       CAST(FLOOR(1000000.0 * (r2_pos - n_pos * (n_pos + 1))
                  / (2.0 * n_pos * n_neg)) AS BIGINT) AS auc_e6
FROM s WHERE n_pos > 0 AND n_neg > 0
"""


@register("l6_auc_roc", oracle=_AUC_SQL, tags=("L6", "W3"), doc="")
def l6_auc_roc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUC-ROC of 'document length predicts English' per source — the
    threshold-free ranking metric beside l6_calibration_ece's
    probability-quality one, and the classifier-eval face of the
    Mann-Whitney U identity x_mann_whitney_u already pins: AUC =
    U/(n_pos*n_neg) = (R_pos - n_pos(n_pos+1)/2)/(n_pos*n_neg) with
    AVERAGE ranks for tied scores. Ranks never materialize per row:
    score-level groups carry (cnt, n_pos, cum_before), the doubled-rank
    identity 2*rank_avg = 2*cum_before + cnt + 1 keeps 2*R_pos an exact
    BIGINT under ties, and the single closing division on identical
    integers is floor-e6. Degenerate sources (no positives or no
    negatives) are excluded — pinned convention both sides. Plan: one
    doc pass -> score-level rollup (tiny) -> one running-sum window ->
    per-source reduce; rank arithmetic is O(distinct scores), not
    O(rows), at any corpus scale."""
    d = T(spark, sf_dir, "documents").select(
        "source",
        F.col("n_chars").alias("score"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("pos"),
    )
    g = d.groupBy("source", "score").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.sum("pos").cast("bigint").alias("np"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy("score")
    r = g.select(
        "source",
        "score",
        "cnt",
        "np",
        (F.sum("cnt").over(w).cast("bigint") - F.col("cnt")).alias("cum_before"),
    )
    s = r.groupBy("source").agg(
        F.sum("np").cast("bigint").alias("n_pos"),
        F.sum(F.col("cnt") - F.col("np")).cast("bigint").alias("n_neg"),
        F.sum(F.col("np") * (2 * F.col("cum_before") + F.col("cnt") + 1))
        .cast("bigint")
        .alias("r2_pos"),
    )
    return s.where((F.col("n_pos") > 0) & (F.col("n_neg") > 0)).select(
        "source",
        "n_pos",
        "n_neg",
        F.floor(
            F.lit(1000000.0)
            * (F.col("r2_pos") - F.col("n_pos") * (F.col("n_pos") + 1))
            / (F.lit(2.0) * F.col("n_pos") * F.col("n_neg"))
        )
        .cast("bigint")
        .alias("auc_e6"),
    )


_TOKEN_F1_SQL = """
WITH pairs AS (
  SELECT doc_id AS cand_id, CAST(XOR(doc_id, 1) AS BIGINT) AS ref_id,
         STRING_SPLIT(text, ' ') AS l
  FROM documents),
uni AS (
  SELECT cand_id, ref_id, UNNEST(l) AS g FROM pairs),
ug AS (
  SELECT cand_id, ref_id, g, COUNT(*) AS n FROM uni GROUP BY 1, 2, 3),
ov AS (
  SELECT c.cand_id, CAST(SUM(LEAST(c.n, r.n)) AS BIGINT) AS o
  FROM ug c JOIN ug r ON r.cand_id = c.ref_id AND r.g = c.g GROUP BY 1),
lens AS (
  SELECT cand_id, ref_id, CAST(LEN(l) AS BIGINT) AS n_tok FROM pairs),
scored AS (
  SELECT t.cand_id,
         CASE WHEN COALESCE(ov.o, 0) = 0 THEN 0
              ELSE CAST(FLOOR(1000000.0 * 2 * ov.o / (t.n_tok + r.n_tok))
                        AS BIGINT)
         END AS f1_e6
  FROM lens t
  JOIN lens r ON r.cand_id = t.ref_id
  LEFT JOIN ov ON ov.cand_id = t.cand_id)
SELECT CAST(cand_id % 8 AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(f1_e6) AS BIGINT) AS f1_mass_e6,
       CAST(MAX(f1_e6) AS BIGINT) AS f1_max_e6
FROM scored GROUP BY 1
"""


@register("l6_token_f1", oracle=_TOKEN_F1_SQL, tags=("L6", "L4"), doc="")
def l6_token_f1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-level F1 (the SQuAD answer-overlap metric — the harmonic
    face of l6_rouge_ngram's recall and l6_bleu's precision): per
    deterministic (candidate, reference) pair (doc_id XOR 1, the house
    symmetric pairing), multiset token overlap o = sum of clipped
    counts, F1 = 2o/(|cand| + |ref|) — and because the harmonic mean of
    the two clipped ratios collapses to that single rational, the whole
    metric is INTEGER except one final division, floor-e6 per pair
    before the bucket reduce (no geometric mean, no sqrt, none of
    BLEU's BP exp). Zero overlap scores 0. Shape: one token explode +
    one digest-keyed clipped-overlap join + one broadcast-sized length
    join — each pair meets only its own tokens, so the join is
    pair-local at any corpus scale."""
    docs = T(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("cand_id"),
        F.col("doc_id").bitwiseXOR(F.lit(1)).cast("bigint").alias("ref_id"),
        F.split(F.col("text"), " ").alias("l"),
    )
    uni = docs.select("cand_id", "ref_id", F.explode("l").alias("g"))
    ug = uni.groupBy("cand_id", "ref_id", "g").agg(F.count(F.lit(1)).alias("n"))
    ug_r = ug.select(
        F.col("cand_id").alias("r_cand"), F.col("g").alias("r_g"),
        F.col("n").alias("r_n"),
    )
    ov = (
        ug.join(
            ug_r,
            on=[
                F.col("r_cand") == F.col("ref_id"),
                F.col("r_g") == F.col("g"),
            ],
        )
        .groupBy("cand_id")
        .agg(F.sum(F.least(F.col("n"), F.col("r_n"))).cast("bigint").alias("o"))
    )
    lens = docs.select(
        "cand_id", "ref_id", F.size("l").cast("bigint").alias("n_tok")
    )
    lens_r = lens.select(
        F.col("cand_id").alias("rl_cand"), F.col("n_tok").alias("r_n_tok")
    )
    scored = (
        lens.join(lens_r, on=[F.col("rl_cand") == F.col("ref_id")])
        .join(ov, on="cand_id", how="left")
        .select(
            "cand_id",
            F.when(F.coalesce(F.col("o"), F.lit(0)) == 0, F.lit(0))
            .otherwise(
                F.floor(
                    F.lit(1000000.0)
                    * 2
                    * F.col("o")
                    / (F.col("n_tok") + F.col("r_n_tok"))
                )
            )
            .cast("bigint")
            .alias("f1_e6"),
        )
    )
    return scored.groupBy(
        (F.col("cand_id") % 8).cast("bigint").alias("bucket")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum("f1_e6").cast("bigint").alias("f1_mass_e6"),
        F.max("f1_e6").cast("bigint").alias("f1_max_e6"),
    )


_MCNEMAR_SQL = """
WITH d AS (
  SELECT source,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
         CASE WHEN n_chars >= 128 THEN 1 ELSE 0 END AS a,
         CASE WHEN POSITION(' scan ' IN text) > 0 THEN 1 ELSE 0 END AS b
  FROM documents),
m AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN a = y AND b != y THEN 1 ELSE 0 END) AS BIGINT)
           AS only_a,
         CAST(SUM(CASE WHEN a != y AND b = y THEN 1 ELSE 0 END) AS BIGINT)
           AS only_b
  FROM d GROUP BY 1)
SELECT source, n, only_a, only_b,
       CASE WHEN only_a + only_b = 0 THEN 0
            ELSE CAST(FLOOR(1000000.0 * (only_a - only_b) * (only_a - only_b)
                            / (only_a + only_b)) AS BIGINT)
       END AS chi2_e6
FROM m
"""


@register("l6_mcnemar", oracle=_MCNEMAR_SQL, tags=("L6", "A6"), doc="")
def l6_mcnemar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNEMAR's paired test per source — 'are these two classifiers
    DIFFERENT on the same documents', the A/B readout that accuracy
    deltas get wrong because they ignore pairing (the model-comparison
    member of the hypothesis-test battery: x_chi_square_independence
    tests independence, x_welch_t_test means, this one paired marginal
    homogeneity). Two deterministic rule classifiers (length >= 128;
    contains ' scan ') predict 'is English'; only the DISCORDANT counts
    matter: chi^2 = (b - c)^2 / (b + c), ALL integer except the single
    closing division, floor-e6, with the b + c = 0 degenerate pinned
    to 0 both sides. One document pass, one per-source reduce — the
    sufficient statistics are two counters, whatever the corpus size."""
    d = T(spark, sf_dir, "documents").select(
        "source",
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
        F.when(F.col("n_chars") >= 128, 1).otherwise(0).alias("a"),
        F.when(F.instr(F.col("text"), " scan ") > 0, 1).otherwise(0).alias("b"),
    )
    m = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(
            F.when((F.col("a") == F.col("y")) & (F.col("b") != F.col("y")), 1)
            .otherwise(0)
        )
        .cast("bigint")
        .alias("only_a"),
        F.sum(
            F.when((F.col("a") != F.col("y")) & (F.col("b") == F.col("y")), 1)
            .otherwise(0)
        )
        .cast("bigint")
        .alias("only_b"),
    )
    diff = F.col("only_a") - F.col("only_b")
    tot = F.col("only_a") + F.col("only_b")
    return m.select(
        "source",
        "n",
        "only_a",
        "only_b",
        F.when(tot == 0, F.lit(0))
        .otherwise(F.floor(F.lit(1000000.0) * diff * diff / tot))
        .cast("bigint")
        .alias("chi2_e6"),
    )


_BRIER_SQL = """
WITH d AS (
  SELECT source,
         n_chars % 100 AS k,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
  FROM documents),
s AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(k - 100 * y AS BIGINT) * (k - 100 * y)) AS BIGINT)
           AS sq_sum,
         CAST(SUM(y) AS BIGINT) AS n_pos
  FROM d GROUP BY 1)
SELECT source, n, n_pos,
       CAST(FLOOR(100.0 * sq_sum / n) AS BIGINT) AS brier_e6,
       CAST(FLOOR(1000000.0 * n_pos / n) AS BIGINT) AS base_rate_e6
FROM s
"""


@register("l6_brier_score", oracle=_BRIER_SQL, tags=("L6", "A6"), doc="")
def l6_brier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BRIER SCORE per source — the strictly-proper scoring rule beside
    l6_calibration_ece's binned calibration gap and l6_auc_roc's
    threshold-free ranking (ECE can be gamed by a constant predictor;
    the Brier score cannot — it decomposes into calibration MINUS
    resolution plus irreducible uncertainty): mean squared error between
    a predicted probability and the 0/1 outcome. The deterministic
    pseudo-model p = (n_chars mod 100)/100 makes every (p - y) an EXACT
    rational k/100, so (p - y)^2 sums as the INTEGER sum of (k - 100y)^2
    — the entire metric is integer arithmetic until the single closing
    division (floor: 1e6 * sq_sum / (10000 * n) = 100 * sq_sum / n),
    zero float discipline needed anywhere. base_rate is the
    always-predict-prevalence reference. One document pass, two integer
    counters per source at any corpus scale."""
    d = T(spark, sf_dir, "documents").select(
        "source",
        (F.col("n_chars") % 100).alias("k"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
    )
    s = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(
            (F.col("k") - 100 * F.col("y")).cast("bigint")
            * (F.col("k") - 100 * F.col("y"))
        )
        .cast("bigint")
        .alias("sq_sum"),
        F.sum("y").cast("bigint").alias("n_pos"),
    )
    return s.select(
        "source",
        "n",
        "n_pos",
        F.floor(F.lit(100.0) * F.col("sq_sum") / F.col("n"))
        .cast("bigint")
        .alias("brier_e6"),
        F.floor(F.lit(1000000.0) * F.col("n_pos") / F.col("n"))
        .cast("bigint")
        .alias("base_rate_e6"),
    )


_CHAR_ENTROPY_SQL = """
WITH chars AS (
  SELECT doc_id, source, UNNEST(STRING_SPLIT(text, '')) AS ch
  FROM documents),
cnt AS (
  SELECT doc_id, source, ch, CAST(COUNT(*) AS BIGINT) AS c
  FROM chars GROUP BY 1, 2, 3),
docs AS (
  SELECT doc_id, source,
         CAST(SUM(c) AS BIGINT) AS n,
         CAST(SUM(CAST(c * LN(CAST(c AS DOUBLE)) AS DECIMAL(25,6)))
              AS DOUBLE) AS clnc
  FROM cnt GROUP BY 1, 2),
h AS (
  SELECT doc_id, source,
         CAST(FLOOR(1000000.0 * (LN(CAST(n AS DOUBLE)) - clnc / n))
              AS BIGINT) AS h_e6
  FROM docs)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(h_e6) AS BIGINT) AS entropy_mass_e6,
       CAST(MIN(h_e6) AS BIGINT) AS entropy_min_e6
FROM h GROUP BY 1
"""


@register("l4_char_entropy", oracle=_CHAR_ENTROPY_SQL, tags=("L4", "F1"), doc="")
def l4_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHARACTER-LEVEL Shannon entropy per document, reduced per source
    (the compression-style quality signal beside l4_repetition_score's
    n-gram recurrence and l4_zipf_exponent's rank-frequency slope:
    near-zero entropy = degenerate/repeated-char spam, the cheapest
    garbage detector in the corpus-hygiene stack): H = ln(n) − Σc·ln(c)/n
    over per-char counts — the factored form that needs ONE log per
    distinct char instead of a probability per char. Float discipline:
    each c·ln(c) term is quantized to DECIMAL(25,6) before the per-doc
    sum (order-independent reduction; the 1e-6 grain sits far above the
    ulp error of counts ≤ doc length), ln(n) is a single fixed-arity
    call, per-doc floor-e6 BEFORE the source reduce keeps the aggregate
    integer. Plan: one explode → (doc, char) rollup → per-doc reduce →
    per-source reduce; all narrow after the first shuffle."""
    docs = T(spark, sf_dir, "documents").select("doc_id", "source", "text")
    chars = docs.select(
        "doc_id",
        "source",
        F.explode(F.split(F.col("text"), "")).alias("ch"),
    )
    cnt = chars.groupBy("doc_id", "source", "ch").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    per_doc = cnt.groupBy("doc_id", "source").agg(
        F.sum("c").cast("bigint").alias("n"),
        F.sum(
            (F.col("c") * F.log(F.col("c").cast("double"))).cast("decimal(25,6)")
        )
        .cast("double")
        .alias("clnc"),
    )
    h = per_doc.select(
        "source",
        F.floor(
            F.lit(1000000.0)
            * (F.log(F.col("n").cast("double")) - F.col("clnc") / F.col("n"))
        )
        .cast("bigint")
        .alias("h_e6"),
    )
    return h.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("h_e6").cast("bigint").alias("entropy_mass_e6"),
        F.min("h_e6").cast("bigint").alias("entropy_min_e6"),
    )


_JS_DIVERGENCE_SQL = """
WITH tok AS (
  SELECT source, UNNEST(STRING_SPLIT(text, ' ')) AS g FROM documents),
src AS (
  SELECT source, g, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY 1, 2),
stot AS (
  SELECT source, CAST(SUM(c) AS BIGINT) AS ns FROM src GROUP BY 1),
gtot AS (
  SELECT g, CAST(SUM(c) AS BIGINT) AS cg FROM src GROUP BY 1),
n_all AS (SELECT CAST(SUM(c) AS BIGINT) AS na FROM src),
terms AS (
  SELECT s.source,
         CAST(s.c AS DOUBLE) / st.ns AS p,
         CAST(g.cg - s.c AS DOUBLE) / (a.na - st.ns) AS q
  FROM src s
  JOIN stot st ON st.source = s.source
  JOIN gtot g ON g.g = s.g
  CROSS JOIN n_all a),
qonly AS (
  SELECT st.source,
         CAST(g.cg AS DOUBLE) / (a.na - st.ns) AS q
  FROM gtot g
  CROSS JOIN n_all a
  JOIN stot st ON TRUE
  LEFT JOIN src s ON s.source = st.source AND s.g = g.g
  WHERE s.g IS NULL),
contrib AS (
  SELECT source,
         CAST(CASE WHEN p > 0 THEN p * LN(2.0 * p / (p + q)) ELSE 0 END
              AS DECIMAL(18,9)) AS tp,
         CAST(CASE WHEN q > 0 THEN q * LN(2.0 * q / (p + q)) ELSE 0 END
              AS DECIMAL(18,9)) AS tq
  FROM terms
  UNION ALL
  SELECT source, CAST(0 AS DECIMAL(18,9)),
         CAST(q * LN(2.0) AS DECIMAL(18,9))
  FROM qonly)
SELECT source,
       CAST(FLOOR(1000000.0 *
              (CAST(SUM(tp) AS DOUBLE) + CAST(SUM(tq) AS DOUBLE)) / 2.0)
            AS BIGINT) AS js_e6
FROM contrib GROUP BY 1
"""


@register("l4_jensen_shannon", oracle=_JS_DIVERGENCE_SQL, tags=("L4", "A1"), doc="")
def l4_jensen_shannon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JENSEN-SHANNON divergence of each source's token distribution vs
    the REST of the corpus (the symmetric, bounded [0, ln2] drift score
    the mixture/rebalance stages need where KL explodes on unseen
    tokens: JS(P||Q) = ½Σp·ln(2p/(p+q)) + ½Σq·ln(2q/(p+q)); the
    leave-one-out Q = (corpus − source) derives by SUBTRACTION from the
    global token counts — one corpus pass serves all 20 comparisons,
    never a per-pair rescan). Zero-handling pinned both sides: p=0
    terms contribute q·ln2 (emitted by the anti-join leg for tokens the
    source never saw), q=0 terms p·ln2 (the CASE falls through to the
    main leg). Each term is quantized to DECIMAL(18,9) before the
    reduce — the l4_zipf_exponent discipline. Plan: token explode →
    (source, token) rollup → broadcast-sized marginals joined back —
    the vocabulary, not the corpus, bounds every join."""
    tok = T(spark, sf_dir, "documents").select(
        "source", F.explode(F.split(F.col("text"), " ")).alias("g")
    )
    src = tok.groupBy("source", "g").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    stot = src.groupBy("source").agg(F.sum("c").cast("bigint").alias("ns"))
    gtot = src.groupBy("g").agg(F.sum("c").cast("bigint").alias("cg"))
    n_all = src.agg(F.sum("c").cast("bigint").alias("na"))
    terms = (
        src.join(F.broadcast(stot), on="source")
        .join(F.broadcast(gtot), on="g")
        .crossJoin(F.broadcast(n_all))
        .select(
            "source",
            (F.col("c").cast("double") / F.col("ns")).alias("p"),
            (
                (F.col("cg") - F.col("c")).cast("double")
                / (F.col("na") - F.col("ns"))
            ).alias("q"),
        )
    )
    qonly = (
        gtot.crossJoin(F.broadcast(n_all))
        .crossJoin(F.broadcast(stot))
        .join(
            src.select(F.col("source").alias("s2"), F.col("g").alias("g2")),
            on=[
                F.col("s2") == F.col("source"),
                F.col("g2") == F.col("g"),
            ],
            how="left_anti",
        )
        .select(
            "source",
            (F.col("cg").cast("double") / (F.col("na") - F.col("ns"))).alias(
                "q"
            ),
        )
    )
    ln2 = F.log(F.lit(2.0))
    contrib = terms.select(
        "source",
        F.when(
            F.col("p") > 0,
            F.col("p") * F.log(2.0 * F.col("p") / (F.col("p") + F.col("q"))),
        )
        .otherwise(0.0)
        .cast("decimal(18,9)")
        .alias("tp"),
        F.when(
            F.col("q") > 0,
            F.col("q") * F.log(2.0 * F.col("q") / (F.col("p") + F.col("q"))),
        )
        .otherwise(0.0)
        .cast("decimal(18,9)")
        .alias("tq"),
    ).unionByName(
        qonly.select(
            "source",
            F.lit(0.0).cast("decimal(18,9)").alias("tp"),
            (F.col("q") * ln2).cast("decimal(18,9)").alias("tq"),
        )
    )
    return contrib.groupBy("source").agg(
        F.floor(
            F.lit(1000000.0)
            * (F.sum("tp").cast("double") + F.sum("tq").cast("double"))
            / 2.0
        )
        .cast("bigint")
        .alias("js_e6"),
    )


_COCHRAN_Q_SQL = """
WITH d AS (
  SELECT doc_id, source,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
         CASE WHEN n_chars >= 128 THEN 1 ELSE 0 END AS a,
         CASE WHEN POSITION(' scan ' IN text) > 0 THEN 1 ELSE 0 END AS b,
         CASE WHEN POSITION(' join ' IN text) > 0 THEN 1 ELSE 0 END AS c
  FROM documents),
corr AS (
  SELECT source,
         CASE WHEN a = y THEN 1 ELSE 0 END AS c1,
         CASE WHEN b = y THEN 1 ELSE 0 END AS c2,
         CASE WHEN c = y THEN 1 ELSE 0 END AS c3
  FROM d),
s AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(c1) AS BIGINT) AS t1,
         CAST(SUM(c2) AS BIGINT) AS t2,
         CAST(SUM(c3) AS BIGINT) AS t3,
         CAST(SUM(c1 + c2 + c3) AS BIGINT) AS gr,
         CAST(SUM((c1 + c2 + c3) * (c1 + c2 + c3)) AS BIGINT) AS gr2
  FROM corr GROUP BY 1)
SELECT source, n, t1, t2, t3,
       CASE WHEN 3 * gr - gr2 = 0 THEN 0
            ELSE CAST(FLOOR(1000000.0 * 2
                   * (3 * (t1 * t1 + t2 * t2 + t3 * t3) - gr * gr)
                   / (3 * gr - gr2)) AS BIGINT)
       END AS q_e6
FROM s
"""


@register("l6_cochran_q", oracle=_COCHRAN_Q_SQL, tags=("L6", "A6"), doc="")
def l6_cochran_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COCHRAN'S Q per source — the k-classifier generalization of
    l6_mcnemar (are these THREE rule classifiers equally accurate on
    the same documents? Q reduces exactly to McNemar's chi-square at
    k = 2): with per-document correctness indicators for the three
    rules, Q = k(k-1)·(kΣTⱼ² - G²) / (kG - ΣRᵢ²) where Tⱼ are
    per-classifier correct totals, G their grand total, and Rᵢ the
    per-document row sums — so the WHOLE statistic reduces to five
    integer counters per source (n, T₁..T₃, ΣRᵢ, ΣRᵢ²; Rᵢ ∈ {0..3}
    makes Rᵢ² a map-side expression) and one closing division,
    floor-e6, with the all-rows-uniform degenerate (denominator 0)
    pinned to 0 both sides. One document pass at any corpus scale."""
    d = T(spark, sf_dir, "documents").select(
        "source",
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
        F.when(F.col("n_chars") >= 128, 1).otherwise(0).alias("a"),
        F.when(F.instr(F.col("text"), " scan ") > 0, 1).otherwise(0).alias("b"),
        F.when(F.instr(F.col("text"), " join ") > 0, 1).otherwise(0).alias("c"),
    )
    eq = lambda col: F.when(F.col(col) == F.col("y"), 1).otherwise(0)  # noqa: E731
    corr = d.select(
        "source",
        eq("a").alias("c1"),
        eq("b").alias("c2"),
        eq("c").alias("c3"),
    )
    r = F.col("c1") + F.col("c2") + F.col("c3")
    s = corr.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("c1").cast("bigint").alias("t1"),
        F.sum("c2").cast("bigint").alias("t2"),
        F.sum("c3").cast("bigint").alias("t3"),
        F.sum(r).cast("bigint").alias("gr"),
        F.sum(r * r).cast("bigint").alias("gr2"),
    )
    den = 3 * F.col("gr") - F.col("gr2")
    num = 3 * (
        F.col("t1") * F.col("t1")
        + F.col("t2") * F.col("t2")
        + F.col("t3") * F.col("t3")
    ) - F.col("gr") * F.col("gr")
    return s.select(
        "source",
        "n",
        "t1",
        "t2",
        "t3",
        F.when(den == 0, F.lit(0))
        .otherwise(F.floor(F.lit(1000000.0) * 2 * num / den))
        .cast("bigint")
        .alias("q_e6"),
    )


_MAP_SQL = """
WITH ranked AS (
  SELECT source,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS rel,
         CAST(ROW_NUMBER() OVER (PARTITION BY source
                ORDER BY n_chars DESC, doc_id) AS BIGINT) AS r
  FROM documents),
hits AS (
  SELECT source, r,
         CAST(SUM(rel) OVER (PARTITION BY source ORDER BY r) AS BIGINT)
           AS cum_hits,
         rel
  FROM ranked),
ap AS (
  SELECT source,
         CAST(SUM(rel) AS BIGINT) AS n_rel,
         CAST(SUM(CASE WHEN rel = 1
              THEN CAST(CAST(cum_hits AS DOUBLE) / r AS DECIMAL(18,9))
              ELSE 0 END) AS DOUBLE) AS ap_sum
  FROM hits GROUP BY 1)
SELECT source, n_rel,
       CAST(FLOOR(1000000.0 * ap_sum / n_rel) AS BIGINT) AS ap_e6
FROM ap WHERE n_rel > 0
"""


@register("l6_mean_avg_precision", oracle=_MAP_SQL, tags=("L6", "W1"), doc="")
def l6_mean_avg_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AVERAGE PRECISION per source (the area-under-PR-curve member of
    the retrieval battery — P@k is one point, MRR the first hit, DCG a
    discounted sum; AP integrates precision OVER the relevant hits and
    is the MAP everyone reports averaged): each source's docs ranked by
    (n_chars DESC, doc_id) — a fully deterministic total order —
    relevance = lang='en', AP = Σ_{hits} precision@rank / n_rel. Every
    precision@rank is the exact rational cum_hits/rank on identical
    integers; terms are quantized DECIMAL(18,9) before the per-source
    sum (order independence) with one closing floor-e6 division.
    Zero-relevant sources excluded, pinned. Plan: one ranking window +
    one running-sum window per source partition, O(docs) total."""
    from pyspark.sql import Window

    ranked = T(spark, sf_dir, "documents").select(
        "source",
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("rel"),
        F.row_number()
        .over(
            Window.partitionBy("source").orderBy(
                F.col("n_chars").desc(), F.col("doc_id")
            )
        )
        .cast("bigint")
        .alias("r"),
    )
    w = Window.partitionBy("source").orderBy("r")
    hits = ranked.select(
        "source",
        "r",
        "rel",
        F.sum("rel").over(w).cast("bigint").alias("cum_hits"),
    )
    ap = hits.groupBy("source").agg(
        F.sum("rel").cast("bigint").alias("n_rel"),
        F.sum(
            F.when(
                F.col("rel") == 1,
                (F.col("cum_hits").cast("double") / F.col("r")).cast(
                    "decimal(18,9)"
                ),
            ).otherwise(F.lit(0).cast("decimal(18,9)"))
        )
        .cast("double")
        .alias("ap_sum"),
    )
    return ap.where(F.col("n_rel") > 0).select(
        "source",
        "n_rel",
        F.floor(F.lit(1000000.0) * F.col("ap_sum") / F.col("n_rel"))
        .cast("bigint")
        .alias("ap_e6"),
    )


_BURSTINESS_SQL = """
WITH tok AS (
  SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS g FROM documents),
dc AS (
  SELECT g, doc_id, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY 1, 2),
n_docs AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM documents),
stats AS (
  SELECT g,
         CAST(SUM(c) AS BIGINT) AS total,
         CAST(SUM(CAST(c AS DECIMAL(38,0)) * c) AS BIGINT) AS c2,
         CAST(COUNT(*) AS BIGINT) AS df
  FROM dc GROUP BY 1),
top AS (
  SELECT s.*, n.nd FROM stats s CROSS JOIN n_docs n
  ORDER BY s.total DESC, s.g LIMIT 20)
SELECT g AS token, total, df AS doc_freq,
       CAST(FLOOR(1000000.0 *
              (CAST(nd AS DOUBLE) * c2 - CAST(total AS DOUBLE) * total)
              / (CAST(nd AS DOUBLE) * total)) AS BIGINT) AS dispersion_e6
FROM top
"""


@register("l4_burstiness", oracle=_BURSTINESS_SQL, tags=("L4", "O1"), doc="")
def l4_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token BURSTINESS — the variance-to-mean dispersion index D over
    per-document counts for the top-20 corpus tokens (Church & Gale's
    observation operationalized: content words arrive in BURSTS, D ≫ 1;
    function words scatter Poisson-like, D ≈ 1 — the signal that
    separates topical terms from glue without any list, feeding the
    same corpus-hygiene stack as l4_zipf_exponent): zeros included by
    algebra, not by densifying — D = (N·Σc² − (Σc)²)/(N·Σc) over the
    docs the token DOES appear in plus the zero mass the closed form
    already accounts for, so the whole statistic is three integer
    counters per token and one floor-e6 division. Top-20 pinned by
    (total DESC, token) — a deterministic TakeOrderedAndProject, never
    a global sort. One explode, one (token, doc) rollup, one token
    reduce."""
    tok = T(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("g")
    )
    dc = tok.groupBy("g", "doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    nd = T(spark, sf_dir, "documents").agg(
        F.count(F.lit(1)).cast("bigint").alias("nd")
    )
    stats = dc.groupBy("g").agg(
        F.sum("c").cast("bigint").alias("total"),
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("c"))
        .cast("bigint")
        .alias("c2"),
        F.count(F.lit(1)).cast("bigint").alias("df"),
    )
    top = (
        stats.crossJoin(F.broadcast(nd))
        .orderBy(F.col("total").desc(), F.col("g"))
        .limit(20)
    )
    return top.select(
        F.col("g").alias("token"),
        "total",
        F.col("df").alias("doc_freq"),
        F.floor(
            F.lit(1000000.0)
            * (
                F.col("nd").cast("double") * F.col("c2")
                - F.col("total").cast("double") * F.col("total")
            )
            / (F.col("nd").cast("double") * F.col("total"))
        )
        .cast("bigint")
        .alias("dispersion_e6"),
    )


_AURC_SQL = """
WITH d AS (
  SELECT source, doc_id, n_chars AS conf,
         CASE WHEN (CASE WHEN n_chars >= 128 THEN 1 ELSE 0 END)
                 != (CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
              THEN 1 ELSE 0 END AS err
  FROM documents),
r AS (
  SELECT source, err,
         CAST(ROW_NUMBER() OVER (PARTITION BY source
                ORDER BY conf DESC, doc_id) AS BIGINT) AS k
  FROM d),
c AS (
  SELECT source, k,
         CAST(SUM(err) OVER (PARTITION BY source ORDER BY k) AS BIGINT)
           AS cum_err
  FROM r),
a AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(CAST(cum_err AS DOUBLE) / k AS DECIMAL(18,9)))
              AS DOUBLE) AS risk_sum,
         CAST(MAX(cum_err) AS BIGINT) AS n_err
  FROM c GROUP BY 1)
SELECT source, n, n_err,
       CAST(FLOOR(1000000.0 * risk_sum / n) AS BIGINT) AS aurc_e6
FROM a
"""


@register("l6_aurc", oracle=_AURC_SQL, tags=("L6", "W3"), doc="")
def l6_aurc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AURC — area under the risk-coverage curve per source (the
    SELECTIVE-prediction metric beside l6_auc_roc's ranking and
    l6_calibration_ece's calibration: if the classifier may ABSTAIN on
    its least-confident documents, what error rate does each coverage
    level buy? AURC integrates risk over coverage; a confidence signal
    that actually orders errors last scores low): docs sort by
    (confidence DESC, doc_id) — a pinned total order — and
    AURC = (1/n)·Σₖ cum_err(k)/k. Every risk term is the exact rational
    cum_err/k on identical integers, quantized DECIMAL(18,9) before the
    per-source sum (order independence), one closing floor-e6 division.
    The deterministic rule classifier and confidence = n_chars make
    the fixture engine-free. One ranking window + one running sum —
    O(docs), the l6_mean_avg_precision shape pointed at errors."""
    from pyspark.sql import Window

    d = T(spark, sf_dir, "documents").select(
        "source",
        "doc_id",
        F.col("n_chars").alias("conf"),
        F.when(
            F.when(F.col("n_chars") >= 128, 1).otherwise(0)
            != F.when(F.col("lang") == "en", 1).otherwise(0),
            1,
        )
        .otherwise(0)
        .alias("err"),
    )
    r = d.select(
        "source",
        "err",
        F.row_number()
        .over(
            Window.partitionBy("source").orderBy(
                F.col("conf").desc(), F.col("doc_id")
            )
        )
        .cast("bigint")
        .alias("k"),
    )
    w = Window.partitionBy("source").orderBy("k")
    c = r.select(
        "source", "k", F.sum("err").over(w).cast("bigint").alias("cum_err")
    )
    a = c.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(
            (F.col("cum_err").cast("double") / F.col("k")).cast("decimal(18,9)")
        )
        .cast("double")
        .alias("risk_sum"),
        F.max("cum_err").cast("bigint").alias("n_err"),
    )
    return a.select(
        "source",
        "n",
        "n_err",
        F.floor(F.lit(1000000.0) * F.col("risk_sum") / F.col("n"))
        .cast("bigint")
        .alias("aurc_e6"),
    )


# -------------------------------------------------- r14 corpus + eval


_TTR_SQL = """
WITH toks AS (
  SELECT source, unnest(list_filter(string_split(lower(text), ' '), x -> x != ''))
           AS tok
  FROM documents),
counts AS (
  SELECT source, tok, COUNT(*) AS c FROM toks GROUP BY 1, 2),
s AS (
  SELECT source,
         CAST(SUM(c) AS BIGINT) AS n_tokens,
         CAST(COUNT(*) AS BIGINT) AS n_types,
         CAST(COUNT(*) FILTER (WHERE c = 1) AS BIGINT) AS n_hapax
  FROM counts GROUP BY 1)
SELECT source, n_tokens, n_types, n_hapax,
       CAST(FLOOR(1000000.0 * n_types / n_tokens) AS BIGINT) AS ttr_e6,
       CAST(FLOOR(1000000.0 * n_hapax / n_types) AS BIGINT) AS hapax_share_e6
FROM s
"""


@register("l4_ttr_hapax", oracle=_TTR_SQL, tags=("L4",), doc="")
def l4_ttr_hapax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-token ratio + hapax legomenon share per source — the two
    classic lexical-richness diagnostics (a source whose TTR collapses
    is template spam; one whose hapax share explodes is OCR noise or
    codegen — both are the corpus-drift alarms beside l4_zipf_exponent's
    slope). One tokenize-explode pass → (source, token) counts →
    three integer aggregates; both ratios are exact integers divided
    once with floor-e6. Shuffle is on the (source, token) key —
    vocabulary-bounded, never document-bounded."""
    d = T(spark, sf_dir, "documents")
    toks = d.select(
        "source",
        F.explode(
            F.filter(F.split(F.lower("text"), " "), lambda x: x != "")
        ).alias("tok"),
    )
    counts = toks.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("c"))
    s = counts.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
        F.count(F.when(F.col("c") == 1, 1)).cast("bigint").alias("n_hapax"),
    )
    return s.select(
        "source",
        "n_tokens",
        "n_types",
        "n_hapax",
        F.floor(F.lit(1000000.0) * F.col("n_types") / F.col("n_tokens"))
        .cast("bigint")
        .alias("ttr_e6"),
        F.floor(F.lit(1000000.0) * F.col("n_hapax") / F.col("n_types"))
        .cast("bigint")
        .alias("hapax_share_e6"),
    )


_NOVELTY_SQL = """
WITH toks AS (
  SELECT source, string_split(lower(text), ' ') AS l FROM documents),
bg AS (
  SELECT DISTINCT source,
         p[1] || ' ' || p[2] AS bigram
  FROM (SELECT source, unnest(list_zip(l[1:len(l)-1], l[2:len(l)])) AS p
        FROM toks WHERE len(l) >= 2)),
spread AS (
  SELECT bigram, COUNT(*) AS n_sources FROM bg GROUP BY 1)
SELECT bg.source,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(COUNT(*) FILTER (WHERE spread.n_sources = 1) AS BIGINT) AS n_novel,
       CAST(FLOOR(1000000.0 * COUNT(*) FILTER (WHERE spread.n_sources = 1)
                  / COUNT(*)) AS BIGINT) AS novelty_e6
FROM bg JOIN spread USING (bigram)
GROUP BY 1
"""


@register("l4_ngram_novelty", oracle=_NOVELTY_SQL, tags=("L4", "L2"), doc="")
def l4_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source bigram NOVELTY: the share of a source's distinct
    bigrams that appear in NO other source — the corpus-mixing signal
    dedup misses (a source can be 0% duplicate yet 0% novel: everything
    it says, someone else already says). Leave-one-out by COUNTING
    SOURCES per bigram (n_sources = 1 ⟺ unique to its source) — one
    corpus pass serves every source simultaneously, the l4_jensen_
    shannon trick at the n-gram level. Shuffles are (source, bigram)
    distinct + a vocabulary-bounded join; exact integers, one floor-e6
    per source."""
    d = T(spark, sf_dir, "documents")
    toks = d.select("source", F.split(F.lower("text"), " ").alias("l")).filter(
        F.size("l") >= 2
    )
    bg = toks.select(
        "source",
        F.explode(
            F.arrays_zip(
                F.slice(F.col("l"), 1, F.size("l") - 1).alias("t1"),
                F.expr("slice(l, 2, size(l) - 1)").alias("t2"),
            )
        ).alias("p"),
    ).select(
        "source", F.concat_ws(" ", F.col("p.t1"), F.col("p.t2")).alias("bigram")
    ).distinct()
    spread = bg.groupBy("bigram").agg(F.count(F.lit(1)).alias("n_sources"))
    j = bg.join(spread, "bigram")
    return j.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
        F.count(F.when(F.col("n_sources") == 1, 1)).cast("bigint").alias("n_novel"),
        F.floor(
            F.lit(1000000.0)
            * F.count(F.when(F.col("n_sources") == 1, 1))
            / F.count(F.lit(1))
        )
        .cast("bigint")
        .alias("novelty_e6"),
    )


@register(
    "l6_ndcg",
    oracle=f"""
WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings WHERE vec_id < 10),
scored AS (
  SELECT q.q_id, e.vec_id,
         CAST(unnest(e.embedding) AS DOUBLE) AS x,
         CAST(unnest(q.q_vec) AS DOUBLE) AS y
  FROM embeddings e CROSS JOIN q
),
agg AS (
  SELECT q_id, vec_id,
         ROUND(SUM(x * y) / (SQRT(SUM(x * x)) * SQRT(SUM(y * y))), 6) AS cs
  FROM scored GROUP BY q_id, vec_id
),
ranked AS (
  SELECT q_id, vec_id, vec_id % 4 AS grade,
         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cs DESC, vec_id) AS rn
  FROM agg
),
top AS (SELECT * FROM ranked WHERE rn <= 10),
ideal AS (
  SELECT q_id, grade,
         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY grade DESC, vec_id) AS irn
  FROM top),
s AS (
  SELECT t.q_id,
         SUM(t.grade * (CASE t.rn {" ".join(f"WHEN {r} THEN {w}" for r, w in enumerate([1000000, 630930, 500000, 430677, 386853, 356207, 333333, 315465, 301030, 289065], start=1))} END)) AS dcg_fp,
         MAX(i.idcg_fp) AS idcg_fp
  FROM top t JOIN (
    SELECT q_id,
           SUM(grade * (CASE irn {" ".join(f"WHEN {r} THEN {w}" for r, w in enumerate([1000000, 630930, 500000, 430677, 386853, 356207, 333333, 315465, 301030, 289065], start=1))} END)) AS idcg_fp
    FROM ideal GROUP BY q_id) i ON i.q_id = t.q_id
  GROUP BY 1)
SELECT q_id,
       CAST(dcg_fp AS BIGINT) AS dcg_fp,
       CAST(idcg_fp AS BIGINT) AS idcg_fp,
       CAST(CASE WHEN idcg_fp = 0 THEN 0
            ELSE FLOOR(1000000.0 * dcg_fp / idcg_fp) END AS BIGINT) AS ndcg_e6
FROM s
""",
    tags=("L6", "L3", "W6"),
)
def l6_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nDCG@10 — l6_dcg_eval normalized by the IDEAL ordering of the
    same retrieved list (re-sort the top-10's own grades descending;
    the 'how well did the ranker ORDER what it found' reading, the
    variant that stays meaningful when corpus-wide grade counts make
    the absolute ideal degenerate). Both DCG and IDCG use the
    established ten round(1e6/log2(r+1)) fixed-point literals, so the
    metric is exact integer arithmetic up to ONE floor-e6 division;
    all-zero-grade lists pin ndcg = 0. Same one-scan plan as dcg_eval:
    broadcast queries, JVM cosine, WindowGroupLimit top-10; the ideal
    re-rank runs over 10 rows per query."""
    from pyspark.sql import Window

    from ..operators.similarity import topk_cosine_join

    e = T(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    top = topk_cosine_join(q, e, k=10, round_to=6)
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    ranked = top.withColumn("rn", F.row_number().over(w)).withColumn(
        "grade", F.col("vec_id") % 4
    )
    wi = Window.partitionBy("q_id").orderBy(F.desc("grade"), F.asc("vec_id"))
    both = ranked.withColumn("irn", F.row_number().over(wi))
    dcg_w = F.expr(_DCG_CASE_SQL)
    idcg_w = F.expr(_DCG_CASE_SQL.replace("CASE rn", "CASE irn"))
    s = both.groupBy("q_id").agg(
        F.sum(F.col("grade") * dcg_w).cast("bigint").alias("dcg_fp"),
        F.sum(F.col("grade") * idcg_w).cast("bigint").alias("idcg_fp"),
    )
    return s.select(
        "q_id",
        "dcg_fp",
        "idcg_fp",
        F.when(F.col("idcg_fp") == 0, F.lit(0))
        .otherwise(F.floor(F.lit(1000000.0) * F.col("dcg_fp") / F.col("idcg_fp")))
        .cast("bigint")
        .alias("ndcg_e6"),
    )


# ------------------------------------------- annotation / label quality
#
# The label-quality layer of a training-data pipeline: when quality
# labels come from an annotator pool (human or model jury), the daily
# health metrics are inter-rater reliability (Krippendorff's alpha with
# missing ratings, Fleiss' kappa on fully-rated units) and scorer-
# ensemble internal consistency (Cronbach's alpha). All three reduce to
# exact-integer sufficient statistics (within-unit category counts,
# score sums and sums of squares) — one shuffle on the unit key, a
# bounded category/item grid, and a single final double division, so
# the plan is a partial-aggregable two-phase aggregate at any corpus
# size. Annotators are SIMULATED deterministically from document
# content: annotator a's label is the content-derived class
# (n_chars % 4) relabeled uniformly at random 20% of the time via a
# Knuth multiplicative hash on (doc_id, a) — the same engine-neutral
# hash discipline as x_sample_deterministic, so Spark and DuckDB stage
# the identical rating matrix.


_ANN_HASH = (
    "((((doc_id * 31 + {a}) % 2147483647) * 1103515245) % 2147483647)"
)


def _ratings_sql() -> str:
    """The staged rating matrix, shared by alpha and kappa oracles."""
    legs = []
    for a in (1, 2, 3):
        h = _ANN_HASH.format(a=a)
        legs.append(
            f"SELECT doc_id, {a} AS annotator, {h} AS h,"
            f" CASE WHEN {h} % 5 = 0 THEN {h} % 4"
            f"      ELSE n_chars % 4 END AS cat"
            f" FROM documents"
        )
    return " UNION ALL ".join(legs)


_KRIPPENDORFF_SQL = f"""
WITH r AS (SELECT * FROM ({_ratings_sql()}) WHERE h % 7 <> 0),
nuc AS (SELECT doc_id, cat, CAST(COUNT(*) AS BIGINT) AS n_uc
        FROM r GROUP BY 1, 2),
u AS (SELECT doc_id, SUM(n_uc) AS m_u, SUM(n_uc * (n_uc - 1)) AS s_u
      FROM nuc GROUP BY 1),
p AS (SELECT * FROM u WHERE m_u >= 2),
t AS (SELECT CAST(SUM((m_u * (m_u - 1) - s_u)
                      * CASE WHEN m_u = 2 THEN 2 ELSE 1 END) AS BIGINT)
               AS disagree_x2,
             CAST(SUM(m_u) AS BIGINT) AS n_ratings,
             CAST(COUNT(*) AS BIGINT) AS n_units
      FROM p),
c AS (SELECT CAST(SUM(cc * cc) AS BIGINT) AS sum_cat_sq
      FROM (SELECT SUM(n_uc) AS cc
            FROM nuc JOIN p USING (doc_id) GROUP BY nuc.cat))
SELECT n_ratings, n_units, disagree_x2, sum_cat_sq,
       CAST(FLOOR(1000000.0 * (1.0
            - CAST(disagree_x2 * (n_ratings - 1) AS DOUBLE)
              / CAST(2 * (n_ratings * n_ratings - sum_cat_sq) AS DOUBLE)))
         AS BIGINT) AS alpha_e6
FROM t, c
"""


@register("l6_krippendorff_alpha", oracle=_KRIPPENDORFF_SQL, tags=("L6", "A1"), doc="")
def l6_krippendorff_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Krippendorff's alpha (nominal) over a 3-annotator rating matrix
    WITH missingness (each rating is skipped when its hash % 7 == 0 —
    alpha is the reliability coefficient that, unlike kappa, admits
    incomplete panels). Sufficient-statistics form: per-unit category
    counts n_uc give within-unit agreement pairs s_u = sum n_uc(n_uc-1);
    the observed-disagreement total sums (m_u(m_u-1) - s_u)/(m_u-1)
    exactly by exploiting m_u in {2, 3} (weight 2 when m_u = 2, the /2
    deferred) — all integers until the single closing division
    alpha = 1 - disagree_x2*(n-1) / (2*(n^2 - sum_c n_c^2)). One
    shuffle on doc_id, a 4-category grid, no per-pair materialization:
    the coincidence matrix never exists as rows."""
    docs = T(spark, sf_dir, "documents").select("doc_id", "n_chars")
    r = docs.select(
        "doc_id",
        "n_chars",
        F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("a"),
    )
    h = (
        (F.col("doc_id") * 31 + F.col("a")) % 2147483647
    ) * 1103515245 % 2147483647
    r = (
        r.select(
            "doc_id",
            h.alias("h"),
            F.when(h % 5 == 0, h % 4).otherwise(F.col("n_chars") % 4).alias("cat"),
        )
        .where(F.col("h") % 7 != 0)
    )
    nuc = r.groupBy("doc_id", "cat").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_uc")
    )
    u = nuc.groupBy("doc_id").agg(
        F.sum("n_uc").alias("m_u"),
        F.sum(F.col("n_uc") * (F.col("n_uc") - 1)).alias("s_u"),
    )
    p = u.where(F.col("m_u") >= 2)
    t = p.agg(
        F.sum(
            (F.col("m_u") * (F.col("m_u") - 1) - F.col("s_u"))
            * F.when(F.col("m_u") == 2, 2).otherwise(1)
        )
        .cast("bigint")
        .alias("disagree_x2"),
        F.sum("m_u").cast("bigint").alias("n_ratings"),
        F.count(F.lit(1)).cast("bigint").alias("n_units"),
    )
    c = (
        nuc.join(p.select("doc_id"), "doc_id")
        .groupBy("cat")
        .agg(F.sum("n_uc").alias("cc"))
        .agg(F.sum(F.col("cc") * F.col("cc")).cast("bigint").alias("sum_cat_sq"))
    )
    out = t.crossJoin(F.broadcast(c))
    n = F.col("n_ratings")
    alpha = F.lit(1.0) - (
        (F.col("disagree_x2") * (n - 1)).cast("double")
        / (F.lit(2) * (n * n - F.col("sum_cat_sq"))).cast("double")
    )
    return out.select(
        "n_ratings",
        "n_units",
        "disagree_x2",
        "sum_cat_sq",
        F.floor(F.lit(1000000.0) * alpha).cast("bigint").alias("alpha_e6"),
    )


_FLEISS_SQL = f"""
WITH r AS (SELECT * FROM ({_ratings_sql()}) WHERE h % 7 <> 0),
nuc AS (SELECT doc_id, cat, CAST(COUNT(*) AS BIGINT) AS n_uc
        FROM r GROUP BY 1, 2),
u AS (SELECT doc_id, SUM(n_uc) AS m_u, SUM(n_uc * n_uc) AS q_u
      FROM nuc GROUP BY 1),
full_units AS (SELECT * FROM u WHERE m_u = 3),
t AS (SELECT CAST(SUM(q_u) AS BIGINT) AS ss,
             CAST(COUNT(*) AS BIGINT) AS n_units
      FROM full_units),
c AS (SELECT CAST(SUM(cc * cc) AS BIGINT) AS sum_cat_sq
      FROM (SELECT SUM(n_uc) AS cc
            FROM nuc JOIN full_units USING (doc_id) GROUP BY nuc.cat))
SELECT n_units, ss, sum_cat_sq,
       CAST(FLOOR(1000000.0 *
         ((CAST(ss - 3 * n_units AS DOUBLE) / CAST(6 * n_units AS DOUBLE)
           - CAST(sum_cat_sq AS DOUBLE) / CAST(9 * n_units * n_units AS DOUBLE))
          / (1.0 - CAST(sum_cat_sq AS DOUBLE)
                   / CAST(9 * n_units * n_units AS DOUBLE))))
         AS BIGINT) AS kappa_e6
FROM t, c
"""


@register("l6_fleiss_kappa", oracle=_FLEISS_SQL, tags=("L6", "A1"), doc="")
def l6_fleiss_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleiss' kappa over the SAME staged panel restricted to fully-
    rated units (m_u = 3 — kappa's fixed-raters precondition; the
    missing-tolerant sibling is l6_krippendorff_alpha). P-bar and
    chance agreement come from two integer sufficient statistics
    (sum n_uc^2 within units, squared category margins), three exact
    divisions at the very end. Same one-shuffle two-phase aggregate
    shape as alpha."""
    docs = T(spark, sf_dir, "documents").select("doc_id", "n_chars")
    r = docs.select(
        "doc_id",
        "n_chars",
        F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("a"),
    )
    h = (
        (F.col("doc_id") * 31 + F.col("a")) % 2147483647
    ) * 1103515245 % 2147483647
    r = (
        r.select(
            "doc_id",
            h.alias("h"),
            F.when(h % 5 == 0, h % 4).otherwise(F.col("n_chars") % 4).alias("cat"),
        )
        .where(F.col("h") % 7 != 0)
    )
    nuc = r.groupBy("doc_id", "cat").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_uc")
    )
    u = nuc.groupBy("doc_id").agg(
        F.sum("n_uc").alias("m_u"),
        F.sum(F.col("n_uc") * F.col("n_uc")).alias("q_u"),
    )
    full_units = u.where(F.col("m_u") == 3)
    t = full_units.agg(
        F.sum("q_u").cast("bigint").alias("ss"),
        F.count(F.lit(1)).cast("bigint").alias("n_units"),
    )
    c = (
        nuc.join(full_units.select("doc_id"), "doc_id")
        .groupBy("cat")
        .agg(F.sum("n_uc").alias("cc"))
        .agg(F.sum(F.col("cc") * F.col("cc")).cast("bigint").alias("sum_cat_sq"))
    )
    out = t.crossJoin(F.broadcast(c))
    nu = F.col("n_units")
    p_bar = (F.col("ss") - 3 * nu).cast("double") / (F.lit(6) * nu).cast("double")
    p_e = F.col("sum_cat_sq").cast("double") / (F.lit(9) * nu * nu).cast("double")
    kappa = (p_bar - p_e) / (F.lit(1.0) - p_e)
    return out.select(
        "n_units",
        "ss",
        "sum_cat_sq",
        F.floor(F.lit(1000000.0) * kappa).cast("bigint").alias("kappa_e6"),
    )


_CRONBACH_SQL = """
WITH s AS (
  SELECT doc_id,
         n_chars + ((((doc_id * 31 + 1) % 2147483647) * 1103515245)
                    % 2147483647) % 100 AS x1,
         n_chars + ((((doc_id * 31 + 2) % 2147483647) * 1103515245)
                    % 2147483647) % 100 AS x2,
         n_chars + ((((doc_id * 31 + 3) % 2147483647) * 1103515245)
                    % 2147483647) % 100 AS x3
  FROM documents),
t AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x1) AS BIGINT) AS s1, CAST(SUM(x1 * x1) AS BIGINT) AS q1,
         CAST(SUM(x2) AS BIGINT) AS s2, CAST(SUM(x2 * x2) AS BIGINT) AS q2,
         CAST(SUM(x3) AS BIGINT) AS s3, CAST(SUM(x3 * x3) AS BIGINT) AS q3,
         CAST(SUM(x1 + x2 + x3) AS BIGINT) AS st,
         CAST(SUM((x1 + x2 + x3) * (x1 + x2 + x3)) AS BIGINT) AS qt
  FROM s)
SELECT n,
       CAST(FLOOR(1000000.0 * (1.5 * (1.0 -
         CAST((n * q1 - s1 * s1) + (n * q2 - s2 * s2) + (n * q3 - s3 * s3)
           AS DOUBLE)
         / CAST(n * qt - st * st AS DOUBLE)))) AS BIGINT) AS cronbach_e6
FROM t
"""


@register("l6_cronbach_alpha", oracle=_CRONBACH_SQL, tags=("L6", "A1", "F3"), doc="")
def l6_cronbach_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cronbach's alpha for a 3-scorer quality ensemble — the internal-
    consistency check a pipeline runs before trusting an averaged
    quality score: three scorer variants each read the same document
    signal (n_chars) plus independent bounded hash noise (each rater
    index enters the Knuth hash BEFORE the multiplicative step — adding
    it after would shift one stream by a constant and the mod-wraparound
    would anti-correlate the noises, observed as negative alpha in the
    first staging), and alpha =
    k/(k-1) * (1 - sum var_i / var_total) says whether they measure one
    construct. Exactness: every variance is scaled by N^2
    (V = N*sum x^2 - (sum x)^2, pure bigint — scores are bounded by
    max document length + 100, so V stays under 2^63 past 10^9
    documents at the staged lengths), the N^2 factors
    cancel in the ratio, and the only floats are the final division and
    the 1.5 multiplier. ONE scan, one 9-column partial aggregate, one
    output row — the cheapest possible plan shape."""
    d = T(spark, sf_dir, "documents").select("doc_id", "n_chars")
    base = F.col("n_chars")

    def item(a: int):
        h = (
            (F.col("doc_id") * 31 + F.lit(a)) % 2147483647
        ) * 1103515245 % 2147483647
        return base + h % 100

    s = d.select(
        item(1).alias("x1"), item(2).alias("x2"), item(3).alias("x3")
    ).withColumn("xt", F.col("x1") + F.col("x2") + F.col("x3"))
    t = s.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        *[
            c
            for i in ("1", "2", "3")
            for c in (
                F.sum(F.col(f"x{i}")).cast("bigint").alias(f"s{i}"),
                F.sum(F.col(f"x{i}") * F.col(f"x{i}")).cast("bigint").alias(f"q{i}"),
            )
        ],
        F.sum("xt").cast("bigint").alias("st"),
        F.sum(F.col("xt") * F.col("xt")).cast("bigint").alias("qt"),
    )
    n = F.col("n")
    v = lambda si, qi: n * F.col(qi) - F.col(si) * F.col(si)  # noqa: E731
    alpha = F.lit(1.5) * (
        F.lit(1.0)
        - (v("s1", "q1") + v("s2", "q2") + v("s3", "q3")).cast("double")
        / (n * F.col("qt") - F.col("st") * F.col("st")).cast("double")
    )
    return t.select(
        "n",
        F.floor(F.lit(1000000.0) * alpha).cast("bigint").alias("cronbach_e6"),
    )


_URL_SQL = """
SELECT 'crawl-' || CAST(doc_id % 50 AS VARCHAR) || '.example.com' AS host,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT source || ' #' || lang) AS BIGINT) AS n_sources
FROM documents
GROUP BY 1
"""


@register("l4_url_host_stats", oracle=_URL_SQL, tags=("L4", "F1"), doc="")
def l4_url_host_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The crawl-pipeline URL surface: documents get a staged crawl URL
    (host sharded by doc_id, an url_encode-d query parameter carrying
    characters that REQUIRE escaping — space and '#', which would
    truncate a naive parse at the fragment), and the per-domain stats —
    the input to domain quotas, robots grouping, per-site dedup — are
    computed ONLY through `parse_url`/`url_decode` on the assembled
    string. The oracle restates the staging from the original columns,
    so the hash proves extraction + decode are exact inverses of
    assembly + encode. All four functions are JVM codegen built-ins
    (no UDF); per-domain grouping is the natural partitioner for crawl
    post-processing at any scale."""
    d = T(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    url = F.concat(
        F.lit("https://crawl-"),
        (F.col("doc_id") % 50).cast("string"),
        F.lit(".example.com/docs/"),
        F.col("lang"),
        F.lit("/"),
        F.col("doc_id").cast("string"),
        F.lit("?src="),
        F.url_encode(F.concat(F.col("source"), F.lit(" #"), F.col("lang"))),
    )
    parsed = d.select(
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.url_decode(F.parse_url(url, F.lit("QUERY"), F.lit("src"))).alias("src"),
    )
    return parsed.groupBy("host").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.countDistinct("src").cast("bigint").alias("n_sources"),
    )


_MINHASH_BOUND_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(list_distinct(list_filter(string_split(text, ' '), t -> t != ''))) AS w
  FROM documents WHERE doc_id < 1000
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY 1),
common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
  FROM tok a JOIN tok b ON a.w = b.w AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       c * 1.0 / (sa.n + sb.n - c) AS jaccard,
       TRUE AS within_bound
FROM common
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.9
"""


@register("x_minhash_error_bound", oracle=_MINHASH_BOUND_SQL, tags=("L2", "A3"), doc="")
def x_minhash_error_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MinHash accuracy contract, driver-checked (the L2 sibling of
    x_tdigest_error_bound / x_hll_error_bound): over the SAME exact
    high-similarity pair set l2_word_jaccard pins (word-level J ≥ 0.9 on
    the deterministic 1000-doc slice), compute each pair's k=64 MinHash
    estimate — matching signature positions / k — and emit whether it
    sits within 0.25 of the exact Jaccard (≈6.7σ for k=64 at J≈0.9; the
    permutations are fixed-coefficient hashes, no RNG, so the booleans
    are stable facts). The oracle recomputes the exact pairs and states
    TRUE — a red row means the signature scheme's estimator drifted
    from the similarity it exists to approximate. The estimate itself
    (engine-specific hash minima) stays out of the output, which is
    exactly why the primary L2 pipeline is rows-only."""
    d = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    pairs = jaccard_pairs(d, "doc_id", "text", w=1, threshold=0.9)
    sigs = minhash_signature(d.select("doc_id", "text"), "text", k=64, w=1)
    sa = sigs.select(F.col("doc_id").alias("id_a"), F.col("signature").alias("sig_a"))
    sb = sigs.select(F.col("doc_id").alias("id_b"), F.col("signature").alias("sig_b"))
    est = (
        F.size(
            F.filter(
                F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: x == y),
                lambda b: b,
            )
        ).cast("double")
        / F.lit(64.0)
    )
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            "jaccard",
            (F.abs(est - F.col("jaccard")) <= F.lit(0.25)).alias("within_bound"),
        )
    )
