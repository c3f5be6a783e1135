"""Round-14 wave II: edge pins for the analytics additions — the Holt
fold's degenerate series lengths (the registry query always sees ~81
months, so the n=2/n=3 branches need synthetic pins), the fuzzy
search's deterministic tie-break, independent textbook references for
the annotation-reliability statistics, and the exact-replay +
distortion-bound pins for the quantized logistic IRLS."""

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


def _panel_reference(ratings):
    """Independent Krippendorff alpha (nominal) / Fleiss kappa from a
    {(unit, rater): cat} dict — straight from the textbook definitions
    (coincidence matrix for alpha; per-unit P_i for kappa)."""
    from collections import Counter, defaultdict

    by_unit = defaultdict(list)
    for (u, _), c in ratings.items():
        by_unit[u].append(c)
    pairable = {u: cs for u, cs in by_unit.items() if len(cs) >= 2}
    # alpha
    n = sum(len(cs) for cs in pairable.values())
    cats = sorted({c for cs in pairable.values() for c in cs})
    o = Counter()
    for cs in pairable.values():
        m = len(cs)
        for i, ci in enumerate(cs):
            for j, cj in enumerate(cs):
                if i != j:
                    o[(ci, cj)] += 1.0 / (m - 1)
    nc = {c: sum(o[(c, k)] for k in cats) for c in cats}
    d_o = sum(v for (ci, cj), v in o.items() if ci != cj) / n
    d_e = sum(nc[ci] * nc[cj] for ci in cats for cj in cats if ci != cj) / (
        n * (n - 1)
    )
    alpha = 1 - d_o / d_e
    # kappa over fully-rated (3) units
    full = [cs for cs in by_unit.values() if len(cs) == 3]
    N = len(full)
    p_i = [
        (sum(v * v for v in Counter(cs).values()) - 3) / 6.0 for cs in full
    ]
    cj = Counter(c for cs in full for c in cs)
    p_bar = sum(p_i) / N
    p_e = sum((v / (3.0 * N)) ** 2 for v in cj.values())
    kappa = (p_bar - p_e) / (1 - p_e)
    return alpha, kappa


def test_krippendorff_and_fleiss_match_textbook_reference(spark, tmp_path):
    """Stage a small documents table, replay the query's exact hash
    staging in Python, and compare the query outputs against an
    independent textbook implementation of both coefficients."""
    import math

    rows = [(i, "x" * (20 + i % 37), "en", "s", 20 + i % 37) for i in range(60)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    ratings = {}
    for i in range(60):
        n_chars = 20 + i % 37
        for a in (1, 2, 3):
            h = ((i * 31 + a) % 2147483647) * 1103515245 % 2147483647
            if h % 7 == 0:
                continue
            ratings[(i, a)] = h % 4 if h % 5 == 0 else n_chars % 4
    want_alpha, want_kappa = _panel_reference(ratings)

    from retail_datalakehouse_spark.queries.llm import (
        l6_fleiss_kappa,
        l6_krippendorff_alpha,
    )

    got_a = l6_krippendorff_alpha(spark, str(tmp_path)).collect()[0]
    got_k = l6_fleiss_kappa(spark, str(tmp_path)).collect()[0]
    assert got_a.alpha_e6 == math.floor(1e6 * want_alpha)
    assert got_k.kappa_e6 == math.floor(1e6 * want_kappa)


def test_cronbach_alpha_is_high_for_shared_signal(spark):
    """Three noisy reads of one signal must be internally consistent:
    alpha close to 1 (and never above 1)."""
    from retail_datalakehouse_spark.queries.llm import l6_cronbach_alpha

    got = l6_cronbach_alpha(spark, "/root/testdata/sf0.001").collect()[0]
    assert 900000 < got.cronbach_e6 <= 1000000


def test_logistic_irls_matches_python_reference(spark):
    """Replay the query's exact quantized Newton in plain Python over
    the same staged rows (floor-e5 equality), and pin that the
    quantization does not distort the fit: an UNQUANTIZED float Newton
    lands within 1e-3 of the same betas."""
    import math

    import duckdb

    from retail_datalakehouse_spark.queries.analytics import x_logistic_irls

    rows = duckdb.sql(
        "SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) - 15000000 AS xi,"
        " CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END"
        " AS y FROM '/root/testdata/sf0.001/orders.parquet'"
    ).fetchall()

    def newton(quantize):
        b0 = b1 = 0.0
        for _ in range(4):
            sw = swx = swxx = sr = srx = 0
            for xi, y in rows:
                z = b0 + b1 * (float(xi) / 1e7)
                p = 1.0 / (1.0 + math.exp(-z))
                if quantize:
                    pe6 = math.floor(p * 1000000.0 + 0.5)
                    w, r = pe6 * (1000000 - pe6), y * 1000000 - pe6
                    sw += w; swx += w * xi; swxx += w * xi * xi
                    sr += r; srx += r * xi
                else:
                    w, r = p * (1 - p), y - p
                    x = float(xi) / 1e7
                    sw += w; swx += w * x; swxx += w * x * x
                    sr += r; srx += r * x
            if quantize:
                sw, swx, swxx = float(sw) / 1e12, float(swx) / 1e19, float(swxx) / 1e26
                sr, srx = float(sr) / 1e6, float(srx) / 1e13
            det = sw * swxx - swx * swx
            b0, b1 = b0 + (swxx * sr - swx * srx) / det, b1 + (sw * srx - swx * sr) / det
        return b0, b1

    got = x_logistic_irls(spark, "/root/testdata/sf0.001").collect()[0]
    qb0, qb1 = newton(quantize=True)
    assert got.beta0_e5 == math.floor(qb0 * 100000.0)
    assert got.beta1_e5 == math.floor(qb1 * 100000.0)
    fb0, fb1 = newton(quantize=False)
    assert abs(qb0 - fb0) < 1e-3 and abs(qb1 - fb1) < 1e-3
    assert got.n_correct >= got.n_pos  # at least the majority-class rate
