"""Property-based tests (hypothesis) for algebraic invariants — SURVEY §5.5:
merge idempotency, dedup idempotency, filter/union commutation, window-sum
vs group-sum totals."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import Window
from pyspark.sql import functions as F

from retail_datalakehouse_spark.operators.dedup import dedup_keep_first
from retail_datalakehouse_spark.operators.merge import merge_upsert

ROWS = st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 5), st.integers(-1000, 1000)),
    min_size=0,
    max_size=40,
)

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


def _df(spark, rows):
    return spark.createDataFrame(
        [(i, k, v) for i, (k, _, v) in enumerate(rows)] or [(0, 0, 0)], ["id", "key", "v"]
    )


@given(rows=ROWS)
@SETTINGS
def test_dedup_idempotent(spark, rows):
    df = _df(spark, rows)
    once = dedup_keep_first(df, ["key"], ["id"])
    twice = dedup_keep_first(once, ["key"], ["id"])
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


@given(rows=ROWS, upd=ROWS)
@SETTINGS
def test_merge_idempotent_and_key_unique(spark, rows, upd):
    target = dedup_keep_first(_df(spark, rows), ["key"], ["id"])
    updates = dedup_keep_first(_df(spark, upd), ["key"], ["id"])
    once = merge_upsert(target, updates, ["key"])
    twice = merge_upsert(once, updates, ["key"])
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))
    # post-merge keys are unique
    n_keys = once.select("key").distinct().count()
    assert once.count() == n_keys


@given(rows=ROWS, threshold=st.integers(-500, 500))
@SETTINGS
def test_filter_union_commutes(spark, rows, threshold):
    df = _df(spark, rows)
    half_a = df.filter(F.col("key") % 2 == 0)
    half_b = df.filter(F.col("key") % 2 == 1)
    pre = half_a.filter(F.col("v") > threshold).unionByName(half_b.filter(F.col("v") > threshold))
    post = half_a.unionByName(half_b).filter(F.col("v") > threshold)
    assert sorted(map(tuple, pre.collect())) == sorted(map(tuple, post.collect()))


@given(rows=ROWS)
@SETTINGS
def test_window_sum_equals_group_sum(spark, rows):
    """The final running-total per key equals the group total (W3 ≡ A1)."""
    df = _df(spark, rows)
    w = Window.partitionBy("key").orderBy("id").rowsBetween(Window.unboundedPreceding, 0)
    last_running = (
        df.withColumn("run", F.sum("v").over(w))
        .groupBy("key")
        .agg(F.max_by("run", "id").alias("total"))
    )
    group_total = df.groupBy("key").agg(F.sum("v").alias("total"))
    assert sorted(map(tuple, last_running.collect())) == sorted(
        map(tuple, group_total.collect())
    )


@given(
    keys=st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=80),
    lo=st.integers(min_value=-100, max_value=11_000),
    span=st.integers(min_value=0, max_value=2_000),
)
@SETTINGS
def test_skipping_scan_equals_full_filter(spark, tmp_path_factory, keys, lo, span):
    """For ANY key set and ANY range (inside, straddling, or fully outside
    the domain), the stats-pruned scan returns exactly the full-scan
    filter result."""
    from retail_datalakehouse_spark.sources.skipping import (
        collect_file_stats,
        skipping_scan,
        write_clustered,
    )

    hi = lo + span
    df = spark.createDataFrame([(k, k * 2) for k in keys], ["k", "payload"])
    path = str(tmp_path_factory.mktemp("skip") / "t")
    write_clustered(df, path, "k", n_files=4)
    stats = collect_file_stats(path, ["k"])
    got, _, _ = skipping_scan(spark, path, stats, "k", lo, hi)
    expected = sorted(
        map(tuple, df.filter((F.col("k") >= lo) & (F.col("k") <= hi)).collect())
    )
    assert sorted(map(tuple, got.collect())) == expected


@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcd"), min_size=0, max_size=12).map(" ".join),
        min_size=1,
        max_size=10,
    ),
    n=st.integers(2, 4),
)
@SETTINGS
def test_duplicate_span_stats_matches_python_reference(spark, docs, n):
    """duplicate_span_stats == brute-force reference: every window whose
    exact text occurs >= 2 times anywhere in the corpus is a dup."""
    from collections import Counter

    from retail_datalakehouse_spark.operators.dedup import duplicate_span_stats

    df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_spans"], r["n_dup_spans"])
        for r in duplicate_span_stats(df, "doc_id", "text", n=n).collect()
    }
    spans_by_doc = {
        i: [
            " ".join(toks[j : j + n])
            for toks in [[t for t in text.split(" ") if t]]
            for j in range(len(toks) - n + 1)
        ]
        for i, text in enumerate(docs)
    }
    freq = Counter(s for spans in spans_by_doc.values() for s in spans)
    want = {
        i: (len(spans), sum(1 for s in spans if freq[s] >= 2))
        for i, spans in spans_by_doc.items()
    }
    assert got == want


@given(
    frames=st.lists(st.booleans(), min_size=1, max_size=12),
    tail=st.integers(0, 3),
)
@SETTINGS
def test_vad_stats_matches_run_length_reference(spark, frames, tail):
    """vad_stats segments == run-length count of the active mask; trailing
    partial frames are dropped."""
    from retail_datalakehouse_spark.operators.multimodal import encode_wav, vad_stats

    frame = 4
    loud, quiet = 25000, 3
    samples = [loud if a else quiet for a in frames for _ in range(frame)]
    samples += [loud] * tail  # partial frame: must be ignored
    df = spark.createDataFrame(
        [(1, bytearray(encode_wav(samples)))], "doc_id long, payload binary"
    )
    row = vad_stats(df, frame=frame, threshold=frame * 10000).collect()[0]
    segs = sum(1 for i, a in enumerate(frames) if a and (i == 0 or not frames[i - 1]))
    assert row["n_frames"] == len(frames)
    assert row["n_active"] == sum(frames)
    assert row["n_segments"] == segs


@given(
    ops=st.lists(
        st.tuples(st.sampled_from(["merge", "delete", "append"]), st.integers(0, 7)),
        min_size=1,
        max_size=3,
    )
)
@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow])
def test_changes_feed_equals_snapshot_diff_on_random_chains(spark, tmp_path_factory, ops):
    """Write-time recorded deltas composed across an arbitrary
    merge/delete/append chain == the snapshot-diff change feed."""
    from pyspark.sql import functions as F

    from retail_datalakehouse_spark.sources.table_format import VersionedTable

    path = str(tmp_path_factory.mktemp("cdfprop") / "t")
    t = VersionedTable(spark, path, record_cdf=True, cdf_keys=["k"])
    t.overwrite(spark.createDataFrame([(i, i * 10) for i in range(12)], ["k", "v"]))
    for step, (op, arg) in enumerate(ops):
        if op == "merge":
            t.merge(
                spark.createDataFrame(
                    [(arg, arg * 100 + 1), (arg + 10, arg)], ["k", "v"]
                ),
                keys=["k"],
            )
        elif op == "delete":
            t.delete(F.col("k") % 5 == arg % 5)
        else:
            # unique key per step: duplicate keys would make key-based
            # classification undefined on BOTH sides
            t.append(spark.createDataFrame([(20 + 10 * step + arg, arg)], ["k", "v"]))
    v = t.current_version()
    feed = sorted(map(tuple, t.changes_feed(1, v).collect()))
    diff = sorted(map(tuple, t.changes(1, v, keys=["k"]).collect()))
    assert feed == diff


@given(
    ops=st.lists(
        st.tuples(
            st.sampled_from(["update", "delete"]),
            st.integers(min_value=0, max_value=6),
        ),
        min_size=1,
        max_size=3,
    )
)
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
def test_mor_update_delete_chain_matches_reference(spark, tmp_path_factory, ops):
    """ANY chain of merge-on-read position deletes and updates must equal
    the same transforms applied to an in-memory reference — tombstone
    resolution, stacked update images, and never-resurrect all at once,
    under arbitrary interleavings hypothesis picks. The table records a
    write-time CDF (r10: the MOR verbs emit deltas in the same commit),
    so the composed changes_feed must ALSO net to the snapshot diff for
    every chain."""
    from retail_datalakehouse_spark.sources.table_format import VersionedTable

    path = str(tmp_path_factory.mktemp("mor_chain") / "tbl")
    rows = {i: (i % 7, float(i)) for i in range(60)}  # id -> (g, v)
    t = VersionedTable(spark, path, record_cdf=True, cdf_keys=["id"])
    t.overwrite(
        spark.createDataFrame(
            [(i, g, v) for i, (g, v) in rows.items()], "id long, g long, v double"
        )
    )
    for op, m in ops:
        if op == "update":
            t.update_mor(f"g = {m}", {"v": "v * 2 + 1"})
            rows = {
                i: (g, v * 2 + 1 if g == m else v) for i, (g, v) in rows.items()
            }
        else:
            t.delete_mor_pos(f"id % 7 = {m}")
            rows = {i: gv for i, gv in rows.items() if i % 7 != m}
    got = sorted((r.id, r.g, r.v) for r in t.read().collect())
    want = sorted((i, g, v) for i, (g, v) in rows.items())
    assert got == want
    assert t._manifest(t.current_version())["n_rows"] == len(want)
    head = t.current_version()
    if head > 1:
        feed = sorted(map(tuple, t.changes_feed(1, head).collect()))
        diff = sorted(map(tuple, t.changes(1, head, keys=["id"]).collect()))
        assert feed == diff


# ---- r13 integer-identity properties (pure Python — the algebraic
# forms the r13 queries rely on, fuzzed against their literal
# definitions; no Spark session needed)


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 12), st.booleans()), min_size=2, max_size=60
    ).filter(lambda r: any(y for _, y in r) and any(not y for _, y in r))
)
@settings(max_examples=200, deadline=None)
def test_doubled_rank_auc_identity(rows):
    """l6_auc_roc's grouped doubled-rank form == the pairwise AUC
    definition (ties count 1/2) for ANY multiset with both classes."""
    from collections import Counter

    pos = [s for s, y in rows if y]
    neg = [s for s, y in rows if not y]
    brute = sum(
        1.0 if p > q else (0.5 if p == q else 0.0) for p in pos for q in neg
    ) / (len(pos) * len(neg))

    by_score = Counter(s for s, _ in rows)
    np_by_score = Counter(s for s, y in rows if y)
    cum = 0
    r2_pos = 0
    for s in sorted(by_score):
        cnt = by_score[s]
        r2_pos += np_by_score.get(s, 0) * (2 * cum + cnt + 1)
        cum += cnt
    n_pos, n_neg = len(pos), len(neg)
    auc = (r2_pos - n_pos * (n_pos + 1)) / (2.0 * n_pos * n_neg)
    assert abs(auc - brute) < 1e-12


@given(
    vals=st.lists(
        st.tuples(st.integers(0, 50), st.integers(1, 9)), min_size=1, max_size=50
    )
)
@settings(max_examples=200, deadline=None)
def test_weighted_quantile_integer_boundary(vals):
    """x_weighted_quantiles' cross-multiplied cut (4cw >= tw etc.) ==
    the literal 'smallest value whose cumulative weight reaches p*W'
    under the lower convention, for p in {1/4, 1/2, 3/4}."""
    from fractions import Fraction

    agg: dict[int, int] = {}
    for v, w in vals:
        agg[v] = agg.get(v, 0) + w
    tw = sum(agg.values())
    for num, den in [(1, 4), (1, 2), (3, 4)]:
        cum = 0
        literal = None
        for v in sorted(agg):
            cum += agg[v]
            if Fraction(cum, tw) >= Fraction(num, den):
                literal = v
                break
        cum = 0
        integer = None
        for v in sorted(agg):
            cum += agg[v]
            if den * cum >= num * tw:
                integer = v
                break
        assert integer == literal


@given(
    win=st.lists(st.integers(0, 10**7), min_size=2, max_size=20)
)
@settings(max_examples=300, deadline=None)
def test_bollinger_integer_band_identity(win):
    """x_bollinger_bands' (n*x-s)^2 > 4(n*s2-s^2) == |x-mu| > 2*sigma
    EXACTLY (both sides of the comparison are the same rational scaled
    by n^2 > 0), fuzzed including the exact-boundary case."""
    from fractions import Fraction

    x = win[-1]
    n, s, s2 = len(win), sum(win), sum(v * v for v in win)
    int_breach = (n * x - s) ** 2 > 4 * (n * s2 - s * s)
    mu = Fraction(s, n)
    var = Fraction(s2, n) - mu * mu
    exact_breach = (Fraction(x) - mu) ** 2 > 4 * var
    assert int_breach == exact_breach


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 8), st.integers(1, 6)), min_size=2, max_size=40
    )
)
@settings(max_examples=200, deadline=None)
def test_gini_doubled_rank_identity(rows):
    """x_gini_revenue's doubled-average-rank form == the classic
    sorted-index Gini G = (2*sum(i*x_i) - (n+1)*sum(x))/(n*sum(x))
    computed with MEAN-of-ties index positions."""
    from collections import Counter
    from fractions import Fraction

    xs = sorted(v for v, c in rows for _ in range(c))
    n = len(xs)
    t = sum(xs)
    if t == 0:
        return
    # classic with average positions for ties
    by_val = Counter(xs)
    pos = 0
    num = Fraction(0)
    for v in sorted(by_val):
        cnt = by_val[v]
        avg_rank = Fraction(2 * pos + cnt + 1, 2)
        num += avg_rank * v * cnt
        pos += cnt
    classic = Fraction(2) * num / (n * t) - Fraction(n + 1, n)

    # doubled-rank (the query's form): dr = 2*cum_before + cnt + 1
    cum = 0
    drx = 0
    for v in sorted(by_val):
        cnt = by_val[v]
        dr = 2 * cum + cnt + 1
        drx += dr * v * cnt
        cum += cnt
    query_form = Fraction(drx, n * t) - Fraction(n + 1, n)
    assert classic == query_form


@given(
    subjects=st.lists(
        st.tuples(st.integers(0, 15), st.booleans()), min_size=1, max_size=40
    )
)
@settings(max_examples=200, deadline=None)
def test_kaplan_meier_associative_sum_equals_sequential_product(subjects):
    """x_kaplan_meier's 'sum of per-step log factors over dur <= h'
    == the sequential KM product, for every horizon (exact rational
    check; the query's DECIMAL(18,9) quantization only affects the
    final rendering)."""
    from collections import Counter
    from fractions import Fraction

    m = Counter(d for d, _ in subjects)
    dd = Counter(d for d, obs in subjects if obs)
    n_total = len(subjects)
    durs = sorted(m)
    for h in (3, 7, 12):
        # sequential product
        seq = Fraction(1)
        removed = 0
        hit_zero = False
        for t in durs:
            n_at_risk = n_total - removed
            d = dd.get(t, 0)
            if t <= h and d > 0:
                if d >= n_at_risk:
                    hit_zero = True
                else:
                    seq *= Fraction(n_at_risk - d, n_at_risk)
            removed += m[t]
        # associative form: product over qualifying steps in ANY order
        factors = []
        removed = 0
        for t in durs:
            n_at_risk = n_total - removed
            d = dd.get(t, 0)
            if t <= h and 0 < d < n_at_risk:
                factors.append(Fraction(n_at_risk - d, n_at_risk))
            removed += m[t]
        assoc = Fraction(1)
        for f in reversed(factors):  # deliberately a different order
            assoc *= f
        if hit_zero:
            continue  # query pins survival to 0; product identity moot
        assert assoc == seq
