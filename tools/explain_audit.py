"""Physical-plan audit: assert the plans have the shapes that survive a
100× scale-up (SURVEY §4). Run: python tools/explain_audit.py

Checks, per representative query:
- parquet scans carry PushedFilters + pruned ReadSchema (no full-width scan
  behind a narrow projection);
- small dims join via BroadcastHashJoin (no shuffle of the fact side);
- aggregations are two-phase (partial HashAggregate before the exchange);
- top-k compiles to TakeOrderedAndProject (no global sort);
- JVM-only hot paths: no Python eval (BatchEvalPython/ArrowEvalPython) in
  queries that should be pure column math;
- WholeStageCodegen is present in the relational spine.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from retail_datalakehouse_spark import queries as Q  # noqa: E402
from retail_datalakehouse_spark.session import build_spark  # noqa: E402

SF = "/root/testdata/sf0.01"


_plan_cache: dict[str, str] = {}


def plan_of(spark, name: str) -> str:
    if name not in _plan_cache:
        df = Q.all_queries()[name].fn(spark, SF)
        df.collect()  # finalize THIS df's AQE plan (a noop write runs a copy)
        plan = df._jdf.queryExecution().executedPlan().toString()
        # AdaptiveSparkPlan prints "Final Plan" followed by "Initial Plan";
        # keep only the final section so substring counts aren't doubled.
        _plan_cache[name] = plan.split("== Initial Plan ==")[0]
    return _plan_cache[name]


def _top_level_bracket_groups(s: str) -> list[str]:
    groups: list[str] = []
    depth = 0
    start = 0
    for i, ch in enumerate(s):
        if ch == "[":
            if depth == 0:
                start = i
            depth += 1
        elif ch == "]":
            depth -= 1
            if depth == 0:
                groups.append(s[start : i + 1])
    return groups


def _unpartitioned_window_count(plan: str) -> int:
    """Count WindowExec nodes with NO partition spec: an unpartitioned
    Window prints `Window [exprs], [order]` (2 top-level groups) while a
    partitioned one prints `Window [exprs], [part], [order]` (3)."""
    n = 0
    for ln in plan.splitlines():
        stripped = ln.lstrip(" :+-*()0123456789")
        if stripped.startswith("Window ") and len(_top_level_bracket_groups(stripped)) == 2:
            n += 1
    return n


CHECKS: list[tuple[str, str, bool, str]] = [
    # (query, substring, should_be_present, why)
    ("p2_filter_compound", "PushedFilters: [IsNotNull(o_totalprice)", True,
     "filter must reach the parquet scan"),
    ("flagship_region_month_revenue", "BroadcastHashJoin", True,
     "dims must broadcast, not shuffle the fact table"),
    ("flagship_region_month_revenue", "TakeOrderedAndProject", True,
     "top-k must be heap-based, not a global sort"),
    ("a1_pricing_summary", "partial", True,
     "agg must be two-phase (map-side partial before exchange)"),
    ("j2_broadcast_dim_join", "BroadcastHashJoin", True,
     "explicit broadcast hint must materialize"),
    ("l3_topk_cosine", "EvalPython", False,
     "cosine kernel must stay JVM-side (no Python eval)"),
    ("l2_minhash_lsh_neardup", "EvalPython", False,
     "minhash pipeline must stay JVM-side"),
    ("a1_pricing_summary", "*(2) HashAggregate", True,
     "relational spine must compile to codegen (the *(n) star marker)"),
    ("w1_ranking", "WindowGroupLimit", True,
     "rank<=k must push the group-limit below the sort (Spark 3.5+)"),
    ("x_binned_band_join", "BroadcastNestedLoopJoin", False,
     "bin rewrite must eliminate the cartesian nested-loop join"),
    ("x_binned_band_join", "CartesianProduct", False,
     "bin rewrite must eliminate the cartesian product"),
    ("x_exists_subquery", "LeftSemi", True,
     "EXISTS must decorrelate to a semi join, not a per-row subquery"),
    ("x_triangle_count", "CartesianProduct", False,
     "triangle closure must join on vertex keys, never cross-join"),
    ("l2_edit_distance_neardup", "CartesianProduct", False,
     "levenshtein must run only inside blocks (equi-join on blocking key)"),
    ("l2_edit_distance_neardup", "BroadcastNestedLoopJoin", False,
     "blocking key must give a hash join, not an all-pairs nested loop"),
    ("l4_bigrams", "EvalPython", False,
     "bigram zip/explode/count must stay JVM-side"),
    ("l3_pq_topk", "EvalPython", False,
     "PQ encode + ADC scoring must stay JVM-side (literal LUT lookups)"),
    ("l3_pq_topk", "TakeOrderedAndProject", True,
     "ADC candidate top-k must be heap-based, not a global sort"),
    ("x_market_basket", "CartesianProduct", False,
     "pair generation must stay on the basket-key equi-join"),
    ("x_market_basket", "TakeOrderedAndProject", True,
     "top-lift must be heap-based, not a global sort"),
    ("x_ewma_smoothing", "EvalPython", False,
     "the EWMA fold must stay a JVM aggregate expression"),
    ("l3_embedding_neardup", "CartesianProduct", False,
     "banded hyperplane LSH must candidate via band equi-join, never all-pairs"),
    ("l3_embedding_neardup", "BroadcastNestedLoopJoin", False,
     "band match must compile to a hash join, not a nested loop"),
    ("l3_embedding_neardup", "EvalPython", False,
     "sign-bit signatures + cosine verify must stay JVM-side"),
    ("l2_neardup_clusters", "CartesianProduct", False,
     "candidates-first clustering must never expand the corpus-wide pair space"),
    ("l4_boilerplate_removal", "EvalPython", False,
     "segmenting + recurrence count must stay JVM-side column math"),
    ("l4_boilerplate_removal", "partial", True,
     "segment recurrence count must be two-phase (map-side partial)"),
    ("l7_chunking", "Exchange", False,
     "chunk explosion is a narrow map — any shuffle here multiplies at 100 TB"),
    ("l7_chunking", "EvalPython", False,
     "chunk slicing + hashing must stay JVM-side"),
    ("l7_corpus_shuffle", "rangepartitioning", False,
     "training-order shuffle must NOT global-sort; per-shard windows only"),
    ("l2_incremental_neardup", "CartesianProduct", False,
     "new-batch verify must join on shingle/candidate keys, never all-pairs"),
    ("l2_containment_neardup", "CartesianProduct", False,
     "containment pairing must stay on the shared-shingle equi-join"),
    # round 6 additions
    ("l4_bloom_decontamination", "EvalPython", False,
     "bloom probe must be literal-array bit math, not a Python UDF"),
    ("l4_bloom_decontamination", "CartesianProduct", False,
     "verify join must stay on the shingle equi-join"),
    ("l4_perplexity_filter", "EvalPython", False,
     "LM scoring must stay JVM-side (log/exp column math)"),
    ("l4_perplexity_filter", "BroadcastHashJoin", True,
     "the unigram model is a dimension table — it must broadcast"),
    ("l7_epoch_reshard", "EvalPython", False,
     "epoch/shard assignment must be pure hash column math"),
    ("l3_ivf_delete", "EvalPython", False,
     "tombstone-resolved probe must stay JVM-side"),
    ("l3_ivf_delete", "BroadcastHashJoin", True,
     "tombstone anti-join must broadcast the (small) deleted-id set"),
    # round 6 late additions
    ("l2_duplicate_spans", "EvalPython", False,
     "span slicing + frequency join must stay JVM-side column math"),
    ("l2_duplicate_spans", "CartesianProduct", False,
     "span matching must stay on the span-key equi-join, never all-pairs"),
    ("l2_duplicate_spans", "partial", True,
     "span frequency count must be two-phase (map-side partial)"),
    ("l7_temperature_sampling", "EvalPython", False,
     "integer sqrt + weight math must stay JVM-side"),
    ("x_partition_evolution", "PartitionFilters: [isnotnull(order_year", True,
     "the year filter must prune the evolved snapshot's hive directories"),
    ("x_pivot_matrix", "partial", True,
     "explicit-values pivot must compile to a two-phase conditional agg"),
    ("x_pivot_matrix", "Expand", False,
     "pivot must not expand rows (that's rollup/cube); one row per input"),
    ("l4_quality_classifier", "BroadcastHashJoin", True,
     "the weight table is the model dimension — it must broadcast"),
    ("l4_quality_classifier", "EvalPython", False,
     "hash-bucket scoring must stay JVM-side"),
    ("x_table_checksum", "EvalPython", False,
     "row serialization + hash fold must stay JVM-side"),
    ("x_table_checksum", "partial", True,
     "fingerprint aggregate must be two-phase (map-side partial sums)"),
    ("l7_stratified_sample", "WindowGroupLimit", True,
     "rank<=k must push the group limit below the per-stratum sort"),
    ("l4_dsir_resample", "EvalPython", False,
     "hashed importance weighting must stay JVM-side"),
    ("l4_dsir_resample", "BroadcastHashJoin", True,
     "the 256-bucket distribution table must broadcast, never shuffle tokens"),
    ("l3_matryoshka_topk", "TakeOrderedAndProject", True,
     "both retrieval stages must be heap top-k, not global sorts"),
    ("l3_matryoshka_topk", "BroadcastHashJoin", True,
     "the 50-candidate shortlist must broadcast back onto the corpus"),
    ("l3_matryoshka_topk", "EvalPython", False,
     "prefix + full cosine folds must stay JVM-side"),
    ("l7_curriculum_order", "EvalPython", False,
     "difficulty scoring + staging must stay JVM-side"),
    # r8 late additions
    ("f8_variant_semistructured", "EvalPython", False,
     "variant path extraction must stay JVM-side (no Python JSON re-parse)"),
    ("f8_variant_semistructured", "variant_get", True,
     "typed extraction must compile to the native variant_get expression"),
    ("x_hidden_partitioning", "PushedFilters: [IsNotNull(o_orderdate)", True,
     "the residual source-column filter must reach the pruned parquet scan"),
    # r9 additions
    ("x_bitmap_distinct", "partial_bit_or", True,
     "bitmap partials must map-side combine (two-phase bit_or merge)"),
    ("x_bitmap_distinct", "EvalPython", False,
     "word/bit mapping + popcount must stay JVM-side"),
    ("l6_hard_negative_mining", "BroadcastNestedLoopJoin", True,
     "the query set must broadcast (every corpus row scores all queries "
     "locally) — never shuffle the corpus"),
    ("l6_hard_negative_mining", "CartesianProduct", False,
     "the score join must broadcast the small query side, not cartesian"),
    ("l6_hard_negative_mining", "WindowGroupLimit", True,
     "per-query top-k must push the group limit below the sort"),
    ("l6_hard_negative_mining", "EvalPython", False,
     "cosine + label predicate must stay JVM-side"),
    ("x_chunked_manifest", "PushedFilters: [IsNotNull(o_orderdate)", True,
     "the residual range filter must reach the chunk-planned parquet scan"),
    # ---- round 10
    ("l6_mrr_eval", "BroadcastNestedLoopJoin", True,
     "the query-vector side must broadcast — one corpus scan scores all "
     "queries; never shuffle the corpus per query"),
    ("l6_mrr_eval", "WindowGroupLimit", True,
     "per-query top-100 must push the group limit below the sort"),
    ("l6_mrr_eval", "EvalPython", False,
     "cosine folds + fixed-point reciprocal rank must stay JVM-side"),
    ("l4_lang_confidence", "EvalPython", False,
     "marker-intersection scores + argmax must be pure column math"),
    ("l4_lang_confidence", "Exchange", False,
     "per-doc language scoring is map-only — no shuffle at any corpus size"),
    ("l7_token_budget_pack", "FlatMapGroupsInPandas", True,
     "the no-straddle fold is per-shard applyInPandas (Arrow lane)"),
    ("l4_robots_policy_filter", "BroadcastHashJoin", True,
     "the |sources|-row policy register must broadcast, never shuffle the "
     "corpus"),
    ("x_first_value_dedup", "partial_max_by", True,
     "latest-record-wins must be a two-phase aggregate (map-side combine), "
     "not a windowed sort of every version"),
    ("l2_suffix_array_dups", "xxhash64", True,
     "all three span levels must shuffle 8-byte digests, not span text"),
    ("l2_suffix_array_dups", "EvalPython", False,
     "multi-level span profile must stay JVM-side"),
    ("x_grouping_id_rollup", "Expand", True,
     "cube levels must expand map-side (one shuffle for all levels)"),
    ("x_grouping_id_rollup", "partial", True,
     "cube aggregation must keep the map-side partial phase"),
    ("w8_batch_session_window", "MergingSessions", True,
     "batch session windows must compile to the native merging-sessions "
     "aggregation (one exchange on user_id), not a window rewrite"),
    ("w8_batch_session_window", "EvalPython", False,
     "session merging is an engine operator — no Python in the path"),
    ("u9_udtf_table_arg", "BatchEvalPythonUDTF", True,
     "TABLE-argument UDTF must run as the engine's UDTF operator"),
    ("u9_udtf_table_arg", "REPARTITION_BY_COL", True,
     "the PARTITION BY contract must own the exchange (engine-routed "
     "per-user streams, sorted below the UDTF)"),
    # ---- r11 additions
    ("l6_rrf_fusion", "TakeOrderedAndProject", True,
     "each retriever's top-50 must compile to a heap top-k (Catalyst "
     "rewrites the empty-partition rank filter), never a global sort"),
    ("l6_rrf_fusion", "EvalPython", False,
     "cosine/L2 folds must stay JVM-side"),
    ("l4_gopher_rules", "Generate", False,
     "per-doc word histogram must fold inside the row (higher-order "
     "aggregate), never explode into a shuffle"),
    ("l4_gopher_rules", "EvalPython", False,
     "Gopher gates are pure column math"),
    ("x_mv_rollup_answer", "orders.parquet", False,
     "the monthly query must scan ONLY the materialized rollup, never "
     "the raw fact table"),
    ("x_psi_drift", "partial", True,
     "drift bucketing must keep the map-side partial aggregate (one "
     "10-row reduce, free rider on a stats pass)"),
    ("x_bfs_reachability", "InMemoryTableScan", True,
     "the deduped edge list must be persisted and REUSED across BFS "
     "rounds, not recomputed per hop"),
    # r11 widening wave
    ("x_null_safe_join", "BroadcastNestedLoopJoin", False,
     "EqualNullSafe must plan as a HASHABLE equi-join key, never a "
     "nested-loop theta join"),
    ("x_interval_overlap", "partial", True,
     "sweep-line events must collapse map-side (partial agg) before the "
     "daily-grid shuffle — the only pass over the facts"),
    ("x_linear_regression", "partial", True,
     "OLS sufficient statistics must merge map-side; the shuffle "
     "carries 6 numbers per group, never rows"),
    ("x_linear_regression", "EvalPython", False,
     "the closed form is pure column math — no Python in the plan"),
    ("s15_xml_roundtrip", "EvalPython", False,
     "from_xml is a JVM expression inside codegen, not a UDF"),
    ("l6_calibration_ece", "partial", True,
     "calibration bins must partial-aggregate (10-bin reduce)"),
    ("f10_try_arithmetic", "EvalPython", False,
     "try_* error handling is JVM-side, costs nothing over unchecked"),
    ("x_fifo_allocation", "partial", True,
     "FIFO running sums partial-aggregate; the interval join stays "
     "part-co-partitioned"),
    ("x_bitmap_intersect", "EvalPython", False,
     "bitmap packing and popcount(xor) are pure JVM bit math"),
    ("x_weighted_median", "partial", True,
     "per-value weight collapse must partial-aggregate before the "
     "cumulative window walks distinct values"),
    ("l3_binary_quantization", "BroadcastNestedLoopJoin", True,
     "the 1-row query-word side broadcasts (a broadcast of 16 bytes, "
     "the BQ contract: packed index scans stay local)"),
    ("s16_fixed_width_ingest", "EvalPython", False,
     "substring carving is codegen column math, not a UDF"),
    ("x_event_pattern_match", "partial", True,
     "per-user symbol-string reduction partial-aggregates; regexes "
     "run per user-string, never per event"),
    # (the tiny 9-row offsets expansion IS a legitimate broadcast
    # cartesian; the assertion targets the POINTS join being hashed)
    ("x_spatial_grid_join", "BroadcastHashJoin [cy", True,
     "the customer x supplier distance theta-join must become a HASH "
     "equi-join on grid cells with the distance as residual predicate"),
    # ---- r12 stats/warehouse wave
    ("x_mad_outlier", "BroadcastHashJoin", True,
     "the 3-row median/MAD tables must broadcast back to the fact scan, "
     "never shuffle it"),
    ("x_mad_outlier", "EvalPython", False,
     "both median walks are window+aggregate math, no Python"),
    ("x_mann_whitney_u", "EvalPython", False,
     "doubled-rank arithmetic stays JVM-side"),
    ("x_mann_whitney_u", "partial", True,
     "the value grid partial-aggregates map-side before its shuffle"),
    ("x_spearman_corr", "EvalPython", False,
     "rank joins + sufficient sums stay JVM-side"),
    ("x_inferred_dimension", "BroadcastHashJoin", True,
     "dimension joins (anti-join mint, heal, revenue) broadcast the "
     "customers-sized side"),
    ("x_abc_classification", "partial", True,
     "facts reduce to the parts aggregate map-side; the global window "
     "runs over parts only"),
    # ---- r13 wave
    ("x_distinct_on", "WindowGroupLimit", True,
     "DISTINCT ON's row_number()=1 rewrite must push the group limit "
     "below the sort (1 row/key of window state, not a full sort)"),
    ("x_herfindahl_index", "partial", True,
     "facts reduce to the customer rollup map-side; HHI is a 5-row "
     "closed form after that"),
    ("x_herfindahl_index", "EvalPython", False,
     "sufficient-statistics math stays JVM-side"),
    ("x_mann_kendall_trend", "CartesianProduct", False,
     "the day-pair self-join must stay an equi-join on priority (the "
     "grid crossed within the key, never an all-pairs product)"),
    ("x_kaplan_meier", "EvalPython", False,
     "risk table + log-sum survival stay JVM-side"),
    ("x_cuped_adjustment", "BroadcastHashJoin", False,
     "the 1-row pooled stats join is a broadcast nested-loop cross "
     "join by design; what matters is the single fact pass below"),
    ("x_cuped_adjustment", "partial", True,
     "customer pre/post rollup partial-aggregates before its shuffle"),
    ("l4_jensen_shannon", "BroadcastHashJoin", True,
     "token marginals broadcast back onto the (source, token) counts; "
     "the vocabulary, not the corpus, bounds every join"),
    ("l6_auc_roc", "EvalPython", False,
     "doubled-rank AUC arithmetic stays JVM-side"),
    ("u11_arrow_scalar_udf", "ArrowEvalPython", True,
     "useArrow=True must compile to the Arrow eval lane, not pickled "
     "BatchEvalPython"),
    ("u11_arrow_scalar_udf", "BatchEvalPython", False,
     "the pickle lane must NOT appear for an Arrow-optimized UDF"),
    ("s18_multichar_delimiter", "EvalPython", False,
     "multi-char-delimiter parse stays inside the JVM CSV scan"),
    ("x_weighted_quantiles", "partial", True,
     "line items reduce to the (flag, price) grid map-side; windows "
     "run over distinct values only"),
    # r14 wave
    ("x_kruskal_wallis", "partial", True,
     "facts reduce to the value grid map-side before any rank math"),
    ("x_kruskal_wallis", "EvalPython", False,
     "doubled-rank H arithmetic stays JVM-side"),
    ("x_kendall_tau", "CartesianProduct", False,
     "pair masses come from the bounded cell-grid join, facts are "
     "never self-joined"),
    ("l4_ngram_novelty", "EvalPython", False,
     "bigram zip/explode/count stays JVM-side"),
    ("l4_ttr_hapax", "partial", True,
     "token counts partial-aggregate map-side; the shuffle key is the "
     "vocabulary, not the corpus"),
    ("u12_map_in_arrow", "MapInArrow", True,
     "the kernel must compile to the Arrow-batch eval lane"),
    ("u12_map_in_arrow", "BatchEvalPython", False,
     "the pickle lane must NOT appear for mapInArrow"),
    ("x_theil_sen_slope", "FileScan parquet", True,
     "one scan feeds the monthly grid; pairs come from the grid join"),
    # r14 wave II
    ("x_fuzzy_search_topk", "BroadcastNestedLoop", True,
     "the bounded probe batch must broadcast; the catalog is scanned once"),
    ("x_fuzzy_search_topk", "partial", True,
     "best-match min(struct) combines map-side — one row per probe per task"),
    ("x_holt_linear", "EvalPython", False,
     "the smoothing recurrence folds JVM-side via F.aggregate, no Python"),
    ("l6_krippendorff_alpha", "partial", True,
     "within-unit category counts partial-aggregate before the doc_id "
     "shuffle; the coincidence matrix never materializes as rows"),
    ("l6_cronbach_alpha", "partial", True,
     "one scan, one 9-column two-phase aggregate, one output row"),
    ("l6_fleiss_kappa", "EvalPython", False,
     "kappa arithmetic stays JVM-side on integer sufficient statistics"),
    ("x_tdigest_quantiles", "FlatMapGroupsInPandas", True,
     "the sketch build/merge runs in the Arrow grouped-map lane (the "
     "sanctioned Python path for a numpy kernel), never row-at-a-time"),
    ("x_aes_roundtrip", "EvalPython", False,
     "aes_encrypt/aes_decrypt are JVM codegen built-ins, no UDF"),
    ("x_luhn_check", "EvalPython", False,
     "the staged check-digit fold and luhn_check stay JVM-side"),
    ("l4_url_host_stats", "EvalPython", False,
     "parse_url/url_encode/url_decode are JVM built-ins"),
    ("l4_url_host_stats", "partial", True,
     "per-host doc counts partial-aggregate before the host shuffle"),
    ("x_logistic_irls", "EvalPython", False,
     "all four Newton iterations are JVM column math (exp + integer "
     "sufficient statistics), no Python in the per-row path"),
    ("x_logistic_irls", "partial", True,
     "each iteration's five sums partial-aggregate map-side"),
]


def main() -> int:
    spark = build_spark("explain-audit")
    failures = []
    for name, needle, want, why in CHECKS:
        plan = plan_of(spark, name)
        present = needle in plan
        ok = present == want
        status = "PASS" if ok else "FAIL"
        print(f"{status}  {name}: {'has' if present else 'lacks'} {needle!r} ({why})")
        if not ok:
            failures.append((name, needle, why))
    # column pruning: narrow projection must shrink ReadSchema
    df = Q.all_queries()["p1_projection_computed"].fn(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    scan_line = next((ln for ln in plan.splitlines() if "ReadSchema" in ln), "")
    pruning_ok = True
    for should_be_absent in ("l_shipdate", "l_partkey", "l_suppkey", "l_returnflag"):
        if should_be_absent in scan_line:
            failures.append(("p1_projection_computed", should_be_absent, "column pruning"))
            print(f"FAIL  p1 scan reads unneeded column {should_be_absent}")
            pruning_ok = False
    if pruning_ok:
        print("PASS  p1_projection_computed: ReadSchema pruned to used columns")
    # IVF probe: the persisted-index scan must be partition-pruned to the
    # probed clusters (PartitionFilters on centroid_id), not a full read
    plan = plan_of(spark, "l3_ivf_kmeans_topk")
    if "PartitionFilters: [centroid_id" in plan and " IN (" in plan:
        print("PASS  l3_ivf_kmeans_topk: probe scan partition-pruned on centroid_id")
    else:
        failures.append(("l3_ivf_kmeans_topk", "PartitionFilters centroid_id", "IVF probe pruning"))
        print("FAIL  l3_ivf_kmeans_topk: probe scan not partition-pruned")
    # IVF-PQ probe: same partition-pruning contract as the plain IVF index
    plan = plan_of(spark, "l3_ivfpq_topk")
    if "PartitionFilters: [centroid_id" in plan and " IN (" in plan:
        print("PASS  l3_ivfpq_topk: probe scan partition-pruned on centroid_id")
    else:
        failures.append(("l3_ivfpq_topk", "PartitionFilters centroid_id", "IVF-PQ probe pruning"))
        print("FAIL  l3_ivfpq_topk: probe scan not partition-pruned")
    # Bucketed co-located join: after the query materializes its tables,
    # the bare join must be SortMergeJoin with NO Exchange and NO Sort —
    # the pre-shuffled, pre-sorted layout does both jobs at scan time.
    from retail_datalakehouse_spark.sources.bucketing import bucketed_join

    Q.all_queries()["x_bucketed_colocated_join"].fn(spark, SF).collect()
    tag = SF.strip("/").replace("/", "_").replace(".", "_")
    j = bucketed_join(spark, f"rdl_orders_b_{tag}", f"rdl_lineitem_b_{tag}", on=["orderkey"])
    jplan = j._jdf.queryExecution().executedPlan().toString()
    if "SortMergeJoin" in jplan and "Exchange" not in jplan and "Sort " not in jplan:
        print("PASS  x_bucketed_colocated_join: SMJ over bucketed scans, no Exchange/Sort")
    else:
        failures.append(("x_bucketed_colocated_join", "exchange-free SMJ", "bucketed layout"))
        print("FAIL  x_bucketed_colocated_join: join plan still shuffles or sorts")
    # Sessionization: the lag-window, the running-sum window, AND the
    # session aggregation must all reuse ONE user-key hash exchange
    # (HashPartitioning(user_id) satisfies the (user_id, session_id)
    # clustering) — the single-shuffle property that makes it linear.
    plan = plan_of(spark, "x_sessionization")
    n_ex = plan.count("Exchange hashpartitioning")
    if n_ex == 1:
        print("PASS  x_sessionization: one user-key exchange feeds windows + agg")
    else:
        failures.append(("x_sessionization", "single exchange", f"found {n_ex}"))
        print(f"FAIL  x_sessionization: expected 1 hash exchange, found {n_ex}")
    # Column profiler: all per-column stats must come from ONE scan of the
    # table (a single multi-aggregate), not one scan per profiled column.
    plan = plan_of(spark, "x_profile_summary")
    n_scans = plan.count("FileScan parquet")
    if n_scans == 1:
        print("PASS  x_profile_summary: one scan feeds all column stats")
    else:
        failures.append(("x_profile_summary", "single scan", f"found {n_scans}"))
        print(f"FAIL  x_profile_summary: expected 1 FileScan, found {n_scans}")
    # Seeded-IVF index (r2 verdict item 6): the registered l3_ivf_topk must
    # now read the persisted index partition-pruned, like its siblings.
    plan = plan_of(spark, "l3_ivf_topk")
    if "PartitionFilters: [centroid_id" in plan and " IN (" in plan:
        print("PASS  l3_ivf_topk: probe scan partition-pruned on centroid_id")
    else:
        failures.append(("l3_ivf_topk", "PartitionFilters centroid_id", "seeded IVF probe pruning"))
        print("FAIL  l3_ivf_topk: probe scan not partition-pruned")
    # r8: the bloom build side (distributed bit-array fold) must be a
    # TWO-PHASE aggregate — partial bit_or collapses each task's positions
    # to <=2048 rows before the exchange, which is what makes the build's
    # shuffle O(m_bits), independent of the eval split's size.
    import pyspark.sql.functions as F

    from retail_datalakehouse_spark.catalog import load_table
    from retail_datalakehouse_spark.operators.bloom import bloom_words_df, shingle_hash
    from retail_datalakehouse_spark.operators.minhash import shingles

    docs = load_table(spark, SF, "documents")
    sh = docs.select(F.explode(F.array_distinct(shingles("text", w=3))).alias("s"))
    wdf = bloom_words_df(sh.select(shingle_hash(F.col("s")).alias("h")))
    wdf.collect()
    wplan = wdf._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]
    if "partial_bit_or" in wplan and "EvalPython" not in wplan:
        print("PASS  bloom_build_agg: two-phase partial bit_or, JVM-side")
    else:
        failures.append(("bloom_build_agg", "partial_bit_or", "bloom build shape"))
        print("FAIL  bloom_build_agg: build fold not two-phase / left JVM")
    # r8: manifest-planned pruned scan — the residual range filter must
    # still reach the parquet scan of the surviving file list.
    import datetime
    import tempfile

    from retail_datalakehouse_spark.sources.table_format import VersionedTable

    o = load_table(spark, SF, "orders").select("o_orderkey", "o_totalprice", "o_orderdate")
    vt = VersionedTable(spark, tempfile.mkdtemp(prefix="rdl_audit_prune_"))
    vt.overwrite(o.repartitionByRange(16, "o_orderdate"))
    pruned, n_read, n_total_files = vt.read_pruned(
        "o_orderdate", datetime.datetime(1995, 1, 1), datetime.datetime(1995, 6, 30)
    )
    pruned.collect()
    pplan = pruned._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]
    if 0 < n_read < n_total_files and "PushedFilters: [IsNotNull(o_orderdate)" in pplan:
        print(f"PASS  read_pruned: {n_read}/{n_total_files} files planned from manifest, residual filter pushed")
    else:
        failures.append(("read_pruned", "manifest pruning + pushdown", f"{n_read}/{n_total_files}"))
        print("FAIL  read_pruned: pruning or residual pushdown missing")
    # r8: identity assignment must be NARROW — an Arrow mapInPandas over
    # the cached batch, no shuffle, no global sort, no window.
    from retail_datalakehouse_spark.sources.table_format import (
        _with_contiguous_ids,
    )

    base = load_table(spark, SF, "orders").select("o_orderkey").repartition(8)
    assigned, n_assigned = _with_contiguous_ids(base, "sk", 10)
    assigned.collect()
    iplan = assigned._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan =="
    )[0]
    # everything below InMemoryRelation is the INPUT's own build plan
    # (here: the test's explicit repartition) — the assignment's shape is
    # the stage between the result and the cache scan.
    iplan = iplan.split("InMemoryRelation")[0]
    if (
        "MapInPandas" in iplan
        and "Exchange" not in iplan
        and "Sort" not in iplan
        and "Window" not in iplan
        and n_assigned > 0
    ):
        print("PASS  identity_assign: narrow MapInPandas over cached batch, no shuffle/sort/window")
    else:
        failures.append(("identity_assign", "narrow MapInPandas", "plan shape"))
        print("FAIL  identity_assign: assignment plan not narrow")
    base.unpersist()
    # r14: the global-ntile family must carry NO unpartitioned WindowExec —
    # their frames scale with customers, so every window in the plan must
    # have a partition spec (the two-pass distributed rank's per-pid
    # row_number). An unpartitioned Window prints exactly two top-level
    # bracket groups ([exprs], [order]); partitioned prints three.
    for gname in (
        "w5_ntile_percent_rank",
        "x_rfm_segmentation",
        "x_gains_table",
        "x_equi_depth_histogram",
    ):
        plan = plan_of(spark, gname)
        n_bad = _unpartitioned_window_count(plan)
        if n_bad == 0:
            print(f"PASS  {gname}: zero unpartitioned WindowExec (distributed rank)")
        else:
            failures.append((gname, "unpartitioned WindowExec", f"found {n_bad}"))
            print(f"FAIL  {gname}: {n_bad} unpartitioned Window node(s) in plan")
    n_total = len(CHECKS) + 14
    print(f"\n{n_total - len(failures)}/{n_total} plan checks pass")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
