"""Invariant tests for the l7 corpus-preparation operators (split,
packing, rebalance, top-p) — the properties a curation pipeline relies
on, beyond the per-value hash checks the DuckDB gate performs."""

from __future__ import annotations

from pyspark.sql import functions as F

from retail_datalakehouse_spark.queries import all_queries
from retail_datalakehouse_spark.queries.helpers import T

SF = "/root/testdata/sf0.001"


def test_corpus_split_partitions_exactly(spark):
    """train/val/test must partition the corpus: counts and token sums
    add up to the whole, every split non-empty, and assignment is stable
    under re-execution (content hash, no RNG)."""
    q = all_queries()["l7_corpus_split"].fn
    rows = {r.split: r for r in q(spark, SF).collect()}
    assert set(rows) == {"train", "val", "test"}
    total_docs = T(spark, SF, "documents").count()
    assert sum(r.n_docs for r in rows.values()) == total_docs
    again = {r.split: r for r in q(spark, SF).collect()}
    assert {k: (v.n_docs, v.total_tokens) for k, v in rows.items()} == {
        k: (v.n_docs, v.total_tokens) for k, v in again.items()
    }
    # hash-based split ≈ 12/2/2 of 16 buckets; train must dominate
    assert rows["train"].n_docs > rows["val"].n_docs
    assert rows["train"].n_docs > rows["test"].n_docs


def test_sequence_packing_conserves_tokens_and_is_contiguous(spark):
    """Packing must conserve tokens (sum over bins == corpus total) and
    produce contiguous bin ids 0..max within every shard (the
    concat-then-chunk layout has no holes)."""
    out = all_queries()["l7_sequence_packing"].fn(spark, SF).collect()
    d = T(spark, SF, "documents").select(
        F.size(F.filter(F.split("text", " "), lambda t: t != F.lit(""))).alias("n")
    )
    assert sum(r.n_tokens for r in out) == d.agg(F.sum("n")).head()[0]
    by_shard: dict[int, list[int]] = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r.bin_id)
    assert set(by_shard) == set(range(8))
    for shard, bins in by_shard.items():
        assert sorted(bins) == list(range(max(bins) + 1)), f"holes in shard {shard}"


def test_mixture_rebalance_downsamples_toward_smallest(spark):
    """Every language's kept tokens must be bounded by its own total;
    thresholds lie in (0, 256]; the smallest language keeps everything."""
    rows = all_queries()["l7_mixture_rebalance"].fn(spark, SF).collect()
    smallest = min(rows, key=lambda r: r.lang_tokens)
    assert smallest.t256 == 256  # keep-all threshold for the floor language
    for r in rows:
        assert 0 < r.t256 <= 256
        kept = r.kept_tokens or 0
        assert kept <= r.lang_tokens


def test_quality_topp_respects_budget(spark):
    """Per language: kept tokens stay within budget + one overhanging doc
    (a doc is kept iff it STARTS inside the 60% budget), and never exceed
    the language total."""
    rows = all_queries()["l7_quality_topp"].fn(spark, SF).collect()
    max_doc_tokens = (
        T(spark, SF, "documents")
        .select(F.size(F.filter(F.split("text", " "), lambda t: t != F.lit(""))).alias("n"))
        .agg(F.max("n"))
        .head()[0]
    )
    for r in rows:
        budget = 0.6 * r.total_tokens
        assert r.kept_tokens <= budget + max_doc_tokens
        assert r.kept_tokens <= r.total_tokens
        assert r.n_kept >= 1
