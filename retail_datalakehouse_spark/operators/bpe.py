"""Distributed BPE (byte-pair encoding) tokenizer training (SURVEY §2.10
L4 extension — the tokenizer-construction step of a training-data
pipeline, cf. Sennrich et al. 2016 subword-nmt).

Spark-first formulation:

- Training operates on the **distinct-word frequency table** (classic BPE),
  which is vocabulary-sized — orders of magnitude smaller than the corpus —
  so each merge iteration is a small DataFrame job no matter how large the
  underlying corpus is.
- **Pair counting** is a JVM-side transform: zip each word's token array
  with its own tail (`slice`+`zip_with`), explode, weight by word
  frequency, two-phase aggregate. No Python in the loop.
- **Best pair selection** is a metadata-sized collect (one row: the argmax
  with a lexicographic tie-break for determinism).
- **Merge application** is a left-to-right greedy fold (`F.aggregate`):
  append each token, or fuse it into the accumulator's last element when
  (last, current) equals the merge pair — exactly subword-nmt's regex
  left-to-right semantics, as a pure columnar expression.
- Each iteration persists its tokenization and unpersists the previous one
  (k-means-style), keeping lineage flat across iterations.

Encoding a corpus replays the learned merges in order — a chain of the
same columnar folds — then counts tokens; no UDF anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _chars(w):
    """Split a word into single-character tokens (Spark's split keeps a
    trailing empty string at the end-of-string split point — drop it)."""
    return F.filter(F.split(w, "(?!^)"), lambda c: c != F.lit(""))


def _merge_fold(tokens_col, a: str, b: str):
    """Greedy left-to-right application of merge (a, b) → a+b over a token
    array, as a pure JVM fold: acc + [tok], except when acc's last element
    is `a` and tok is `b` — then the last element becomes the fused token."""
    merged = F.lit(a + b)
    return F.aggregate(
        tokens_col,
        F.expr("CAST(array() AS ARRAY<STRING>)"),
        lambda acc, tok: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (tok == F.lit(b)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(tok))),
    )


def _pair_counts(words: DataFrame) -> DataFrame:
    """Adjacent-pair counts over the word-frequency table: pairs from each
    word's token array (zip with tail), weighted by word frequency."""
    pairs = F.when(
        F.size("toks") >= 2,
        F.zip_with(
            F.slice("toks", 1, F.size("toks") - 1),
            F.slice("toks", 2, F.size("toks") - 1),
            lambda x, y: F.struct(x.alias("a"), y.alias("b")),
        ),
    ).otherwise(F.expr("CAST(array() AS ARRAY<STRUCT<a: STRING, b: STRING>>)"))
    return (
        words.select("freq", F.explode(pairs).alias("p"))
        .groupBy("p.a", "p.b")
        .agg(F.sum("freq").alias("n"))
    )


def _apply_merge_local(toks: list[str], a: str, b: str) -> list[str]:
    """Driver-local twin of :func:`_merge_fold` — the identical greedy
    left-to-right fold, so both training paths learn the same merges."""
    out: list[str] = []
    for t in toks:
        if out and out[-1] == a and t == b:
            out[-1] = a + b
        else:
            out.append(t)
    return out


def _local_merge_loop(
    vocab: list[tuple[int, list[str]]], n_merges: int
) -> list[tuple[str, str]]:
    """Classic subword-nmt merge loop over a collected (freq, tokens)
    vocabulary. Same argmax + lexicographic tie-break + support>=2 stop as
    the distributed loop."""
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for freq, toks in vocab:
            for pair in zip(toks, toks[1:]):
                counts[pair] = counts.get(pair, 0) + freq
        if not counts:
            break
        (a, b), n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < 2:
            break
        merges.append((a, b))
        vocab = [(freq, _apply_merge_local(toks, a, b)) for freq, toks in vocab]
    return merges


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 12,
    vocab_driver_threshold: int = 100_000,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from a corpus. Returns the ordered
    merge list. Deterministic: ties on pair count break lexicographically.

    Scale shape (decided r8, closing the r6/r7 review thread): the
    corpus-sized work is ONE distributed job — the distinct-word
    frequency aggregation — after which training state is
    vocabulary-sized, independent of corpus size. The DEFAULT at scale is
    the distributed per-merge loop below; the driver-local loop is a
    bounded optimization taken only when the vocabulary is provably small
    (``<= vocab_driver_threshold`` distinct words — 100k word types ×
    ~1 KB of CPython list-of-chars state ≈ 100 MB, a deliberate bound;
    the earlier 1M default underestimated CPython overhead ~16×). Both
    paths share argmax, tie-break, and stop rule — pinned by the
    path-equivalence test (tests/test_curation.py) — so the threshold is
    purely a cost choice, never a semantics one. Web-scale vocabularies
    (Heaps' law still reaches millions of types at 100 TB with typos/
    code/URLs) take the distributed path automatically.
    """
    words = (
        df.select(F.explode(F.split(F.lower(text_col), " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select("freq", _chars(F.col("w")).alias("toks"))
    ).persist()
    n_vocab = words.count()  # materialize the base tokenization

    if n_vocab <= vocab_driver_threshold:
        vocab = [(r["freq"], list(r["toks"])) for r in words.collect()]
        words.unpersist()
        return _local_merge_loop(vocab, n_merges)

    merges: list[tuple[str, str]] = []
    current = words
    for _ in range(n_merges):
        top = (
            _pair_counts(current)
            .orderBy(F.desc("n"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["n"] < 2:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        nxt = current.select("freq", _merge_fold(F.col("toks"), a, b).alias("toks")).persist()
        nxt.count()
        current.unpersist()
        current = nxt
    current.unpersist()
    return merges


def bpe_encode_counts(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply learned merges to every document and count resulting tokens:
    returns (id, n_bpe_tokens). The merge replay is a chain of columnar
    folds over per-word character arrays — no UDF, fully distributed."""
    word_toks = F.transform(
        F.filter(F.split(F.lower(text_col), " "), lambda w: w != F.lit("")),
        _chars,
    )
    d = df.select(F.col(id_col), word_toks.alias("words"))

    def apply_merge(a: str, b: str):
        # closure factory: PySpark counts lambda params, so default-arg
        # capture (lambda toks, a=a, b=b) would read as a 3-arg lambda
        return lambda toks: _merge_fold(toks, a, b)

    col = F.col("words")
    for a, b in merges:
        col = F.transform(col, apply_merge(a, b))
    return d.select(
        id_col,
        F.aggregate(
            F.transform(col, lambda toks: F.size(toks)), F.lit(0), lambda acc, n: acc + n
        ).alias("n_bpe_tokens"),
    )
