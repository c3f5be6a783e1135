"""Broadcast Bloom-filter membership pre-screen (SURVEY L4 decontamination
at scale; Bloom 1970; the Delta/Iceberg "bloom filter index" idea applied
to corpus hygiene).

The exact eval-vs-train contamination screen (`l4_contamination`) is a
shuffle join on shared shingles — O(train shingles) shuffle rows. At
100 TB the standard production shape is a PRE-SCREEN: the eval set is
small by definition, so its shingle set compresses into a Bloom bit array
(here m bits in m/64 int64 words) that ships to every executor as ONE
literal array column. Each train shingle then probes k bit positions with
pure JVM column math (xxhash64 → element_at → bit test) — no shuffle, no
UDF — and only the surviving candidate docs enter the exact verify join.
Bloom guarantees NO false negatives, so the pre-screen provably loses
nothing (the oracle equality is exact-contamination, independent of the
filter's false-positive rate).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def build_bloom(hashes: list[int], m_bits: int = 1 << 17, k: int = 3) -> list[int]:
    """Driver-side build from the SMALL side's element hashes (the same
    bounded-collect contract a broadcast join's build side has). Returns
    the bit array as m_bits/64 signed int64 words."""
    words = [0] * (m_bits // 64)
    for h in hashes:
        # k derived positions from one 64-bit hash (Kirsch-Mitzenmacher:
        # g_i(x) = h1 + i*h2). Reduce BOTH terms mod m before the
        # multiply-add so the probe side's int64 column arithmetic can
        # never overflow/wrap differently than Python's bignums.
        h1 = h % m_bits  # Python % == Spark pmod for any sign
        # logical (unsigned) shift to mirror shiftrightunsigned exactly,
        # even for the abs(Long.MIN_VALUE) == Long.MIN_VALUE edge
        h2 = (((h & 0xFFFFFFFFFFFFFFFF) >> 17) | 1) % m_bits
        for i in range(k):
            pos = (h1 + i * h2) % m_bits
            words[pos // 64] |= 1 << (pos % 64)
    # to signed int64 so the literal round-trips through Spark LongType
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def build_bloom_agg(
    hashes_df, hash_col: str = "h", m_bits: int = 1 << 17, k: int = 3
) -> list[int]:
    """Distributed build: the SAME k Kirsch-Mitzenmacher positions as
    :func:`build_bloom` / :func:`bloom_probe`, computed as JVM column math
    over the build-side DataFrame, OR-folded per 64-bit word with a
    two-phase ``groupBy(word_idx).agg(bit_or(...))``. Partial aggregation
    collapses every task's contribution to ≤ ``m_bits/64`` rows before the
    shuffle, and the driver collects only the ~2 KB word array — so the
    build side can be any fraction of the corpus without a driver-side
    collect that scales with it (the scale-killer `.distinct().collect()`
    this replaces). No pre-distinct needed: bit_or is idempotent.

    Path-equivalence with the literal builder is pinned by
    tests/test_llm_ops.py::test_bloom_build_agg_equivalence."""
    rows = bloom_words_df(hashes_df, hash_col, m_bits=m_bits, k=k).collect()
    words = [0] * (m_bits // 64)
    for r in rows:
        words[r["w"]] = r["word"]
    return words


def bloom_words_df(
    hashes_df, hash_col: str = "h", m_bits: int = 1 << 17, k: int = 3
):
    """The pre-collect plan of :func:`build_bloom_agg` — exposed so the
    physical-plan audit can assert the two-phase (partial bit_or) shape."""
    h = F.col(hash_col)
    h1 = F.pmod(h, F.lit(m_bits))
    h2 = F.pmod(F.shiftrightunsigned(h, 17).bitwiseOR(F.lit(1)), F.lit(m_bits))
    pos = F.explode(
        F.array(*[F.pmod(h1 + F.lit(i) * h2, F.lit(m_bits)) for i in range(k)])
    ).alias("pos")
    return (
        hashes_df.select(pos)
        .select(
            (F.col("pos") / 64).cast("int").alias("w"),
            F.pmod(F.col("pos"), F.lit(64)).cast("int").alias("b"),
        )
        # shiftleft via call_function: the python wrapper only takes a
        # literal shift amount, the SQL function itself accepts a column
        .select(
            "w", F.call_function("shiftleft", F.lit(1).cast("long"), F.col("b")).alias("m")
        )
        .groupBy("w")
        .agg(F.bit_or("m").alias("word"))
    )


def bloom_probe(words: list[int], hash_col: Column, m_bits: int = 1 << 17, k: int = 3) -> Column:
    """True iff all k positions for ``hash_col`` are set — pure column
    math over the ONE broadcast literal array (element_at + bit test),
    whole-stage-codegen friendly."""
    arr = F.lit(words)
    h1 = F.pmod(hash_col, F.lit(m_bits))
    h2 = F.pmod(
        F.shiftrightunsigned(hash_col, 17).bitwiseOR(F.lit(1)), F.lit(m_bits)
    )
    hits = []
    for i in range(k):
        pos = F.pmod(h1 + F.lit(i) * h2, F.lit(m_bits))
        word = F.element_at(arr, (pos / 64).cast("int") + 1)
        # call_function: the python shiftrightunsigned wrapper only takes a
        # literal shift amount, the SQL function itself accepts a column
        bit = F.call_function(
            "shiftrightunsigned", word, F.pmod(pos, F.lit(64)).cast("int")
        ).bitwiseAND(F.lit(1))
        hits.append(bit == 1)
    out = hits[0]
    for h in hits[1:]:
        out = out & h
    return out


def shingle_hash(col: Column) -> Column:
    """The one hash both build and probe share: non-negative xxhash64."""
    return F.abs(F.xxhash64(col))


def bloom_words_by_file_df(
    df, col: str, file_col: str = "__file", m_bits: int = 1024, k: int = 5
):
    """Per-FILE bloom words for a column — the build plan of
    VersionedTable.build_bloom_index (the Hudi bloom-index / Delta
    ``CREATE BLOOMFILTER INDEX`` idea): one column-pruned scan computes
    ``xxhash64(col)``, derives the SAME k Kirsch-Mitzenmacher positions
    as :func:`build_bloom` / :func:`bloom_test`, and OR-folds them per
    (source file, 64-bit word) with a two-phase ``bit_or`` — partial
    aggregation collapses each task's output to ≤ files×m_bits/64 rows
    before the shuffle. NULLs are dropped first: an equality probe can
    never match NULL, so files holding only NULLs legitimately produce
    no words (= always-skip for point lookups).

    Output: (``file_col``, w, word) — ≤ m_bits/64 rows per file."""
    h = F.xxhash64(F.col(col))
    h1 = F.pmod(h, F.lit(m_bits))
    h2 = F.pmod(F.shiftrightunsigned(h, 17).bitwiseOR(F.lit(1)), F.lit(m_bits))
    pos = F.explode(
        F.array(*[F.pmod(h1 + F.lit(i) * h2, F.lit(m_bits)) for i in range(k)])
    ).alias("pos")
    return (
        df.filter(F.col(col).isNotNull())
        .select(F.col(file_col).alias("file"), pos)
        .select(
            "file",
            (F.col("pos") / 64).cast("int").alias("w"),
            F.pmod(F.col("pos"), F.lit(64)).cast("int").alias("b"),
        )
        .select(
            "file",
            "w",
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), F.col("b")
            ).alias("m"),
        )
        .groupBy("file", "w")
        .agg(F.bit_or("m").alias("word"))
    )


def bloom_test(words: list[int], h: int, m_bits: int, k: int) -> bool:
    """Driver-side membership probe against one file's word array —
    mirrors :func:`build_bloom`'s position math exactly (Python ``%`` ==
    Spark ``pmod`` for any sign; the masked logical shift mirrors
    ``shiftrightunsigned``), so a value hashed JVM-side at build time is
    always found (no false negatives)."""
    h1 = h % m_bits
    h2 = (((h & 0xFFFFFFFFFFFFFFFF) >> 17) | 1) % m_bits
    for i in range(k):
        pos = (h1 + i * h2) % m_bits
        if not (words[pos // 64] >> (pos % 64)) & 1:
            return False
    return True
