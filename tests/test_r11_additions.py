"""Round-11 widening wave: interval sweep-line ops, sufficient-stats OLS,
XML round-trip, null-safe join, try_* quarantine, bitemporal time travel.

Each test pins the EDGE semantics the sf-scale oracle comparison can't
isolate: exact overlap boundaries, single-point intervals, zero-variance
regression input, malformed XML, NULL-vs-NULL join matching, and the
int64 overflow boundary.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F


def _overlap(spark, rows):
    """Max concurrency of [d0, d1] date intervals via the sweep-line."""
    iv = spark.createDataFrame(rows, "d0 date, d1 date")
    from pyspark.sql import Window

    starts = iv.select(F.col("d0").alias("day"), F.lit(1).alias("net"))
    ends = iv.select(F.date_add("d1", 1).alias("day"), F.lit(-1).alias("net"))
    daily = starts.unionAll(ends).groupBy("day").agg(F.sum("net").alias("net"))
    conc = daily.select(F.sum("net").over(Window.orderBy("day")).alias("c"))
    return conc.agg(F.max("c")).first()[0]


def test_interval_overlap_touching_endpoints_count_as_concurrent(spark):
    import datetime as dt

    d = dt.date
    # [1,5] and [5,9] share day 5 (inclusive ends) -> concurrency 2
    assert _overlap(spark, [(d(2024, 1, 1), d(2024, 1, 5)),
                            (d(2024, 1, 5), d(2024, 1, 9))]) == 2
    # [1,4] and [5,9] are adjacent but disjoint -> concurrency 1
    assert _overlap(spark, [(d(2024, 1, 1), d(2024, 1, 4)),
                            (d(2024, 1, 5), d(2024, 1, 9))]) == 1
    # single-point interval stacked on a long one -> 2
    assert _overlap(spark, [(d(2024, 1, 1), d(2024, 1, 9)),
                            (d(2024, 1, 3), d(2024, 1, 3))]) == 2


def test_interval_coalesce_merges_contained_and_touching(spark):
    import datetime as dt

    from pyspark.sql import Window

    d = dt.date
    iv = spark.createDataFrame(
        [
            (d(2024, 1, 1), d(2024, 1, 10)),   # umbrella
            (d(2024, 1, 3), d(2024, 1, 4)),    # contained
            (d(2024, 1, 10), d(2024, 1, 12)),  # touches umbrella end
            (d(2024, 2, 1), d(2024, 2, 2)),    # separate span
        ],
        "d0 date, d1 date",
    )
    w = Window.orderBy("d0", "d1")
    prev_max = F.max("d1").over(w.rowsBetween(Window.unboundedPreceding, -1))
    marked = iv.withColumn(
        "new_span", F.when(F.col("d0") > prev_max, 1).otherwise(0)
    )
    islands = marked.withColumn(
        "span_id", F.sum("new_span").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    spans = (
        islands.groupBy("span_id")
        .agg(F.min("d0").alias("s0"), F.max("d1").alias("s1"))
        .orderBy("s0")
        .collect()
    )
    assert len(spans) == 2
    assert (spans[0]["s0"], spans[0]["s1"]) == (d(2024, 1, 1), d(2024, 1, 12))
    assert (spans[1]["s0"], spans[1]["s1"]) == (d(2024, 2, 1), d(2024, 2, 2))


def test_ols_sufficient_stats_recovers_exact_line(spark):
    # y = 3x + 7 exactly -> slope 3, intercept 7, r2 = 1
    df = spark.createDataFrame(
        [(float(x), 3.0 * x + 7.0) for x in range(1, 11)], "x double, y double"
    )
    s = df.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.col("x").cast("decimal(25,2)")).cast("double").alias("sx"),
        F.sum(F.col("y").cast("decimal(25,2)")).cast("double").alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(30,4)")).cast("double").alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(30,4)")).cast("double").alias("syy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(30,4)")).cast("double").alias("sxy"),
    ).first()
    n, sx, sy, sxx, syy, sxy = s
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    r2 = (n * sxy - sx * sy) ** 2 / ((n * sxx - sx * sx) * (n * syy - sy * sy))
    assert slope == 3.0 and intercept == 7.0 and r2 == 1.0


def test_from_xml_malformed_yields_null_not_error(spark):
    df = spark.createDataFrame(
        [("<order id=\"1\"><total>5.50</total></order>",), ("<order id=\"2\"><total>",)],
        "doc string",
    )
    p = df.select(
        F.from_xml("doc", "struct<_id:long, total:double>").alias("p")
    ).select("p._id", "p.total").collect()
    assert (p[0]["_id"], p[0]["total"]) == (1, 5.5)
    # malformed input parses to NULL fields (PERMISSIVE), the job survives
    assert p[1]["total"] is None


def test_null_safe_join_matches_null_keys(spark):
    a = spark.createDataFrame([(None, "a0"), (1, "a1")], "k int, va string")
    b = spark.createDataFrame([(None, "b0"), (2, "b2")], "k int, vb string")
    got = a.join(b, a["k"].eqNullSafe(b["k"])).select("va", "vb").collect()
    assert [(r["va"], r["vb"]) for r in got] == [("a0", "b0")]
    # and the plan is a hash join, not a nested loop
    plan = a.join(b, a["k"].eqNullSafe(b["k"]))._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan


def test_try_add_overflow_boundary_is_exact(spark):
    df = spark.createDataFrame([(7,), (8,)], "k long")
    got = {
        r["k"]: r["v"]
        for r in df.select(
            "k", F.try_add(F.lit(9223372036854775800).cast("bigint"), F.col("k")).alias("v")
        ).collect()
    }
    assert got[7] == 9223372036854775807  # int64 max, still fine
    assert got[8] is None  # one past -> NULL, not wraparound/abort


def test_bitemporal_v1_belief_unchanged_by_v2_correction(spark):
    from retail_datalakehouse_spark.sources.table_format import VersionedTable

    scd1 = spark.createDataFrame(
        [(1, "BUILDING", "1995-01-01", "9999-12-31")],
        "k long, segment string, valid_from string, valid_to string",
    ).select(
        "k", "segment",
        F.col("valid_from").cast("date").alias("valid_from"),
        F.col("valid_to").cast("date").alias("valid_to"),
    )
    t = VersionedTable(spark, tempfile.mkdtemp(prefix="rdl_bitemp_test_"))
    t.overwrite(scd1)
    v1 = t.current_version()
    scd2 = scd1.withColumn(
        "valid_to", F.lit("1996-06-01").cast("date")
    ).unionByName(
        scd1.select(
            "k", F.lit("RELOCATED").alias("segment"),
            F.lit("1996-06-01").cast("date").alias("valid_from"),
            F.lit("9999-12-31").cast("date").alias("valid_to"),
        )
    )
    t.overwrite(scd2)
    v2 = t.current_version()

    def seg_at(ver, day):
        bd = F.lit(day).cast("date")
        rows = (
            t.read_version(ver)
            .filter((F.col("valid_from") <= bd) & (bd < F.col("valid_to")))
            .select("segment")
            .collect()
        )
        assert len(rows) == 1, rows
        return rows[0]["segment"]

    # transaction time v1: the correction does not exist at any business date
    assert seg_at(v1, "1997-01-01") == "BUILDING"
    # transaction time v2: business time decides
    assert seg_at(v2, "1996-01-01") == "BUILDING"
    assert seg_at(v2, "1997-01-01") == "RELOCATED"


def test_merge_schema_evolution_contract(spark):
    from retail_datalakehouse_spark.sources.table_format import VersionedTable

    t = VersionedTable(spark, tempfile.mkdtemp(prefix="rdl_mergevo_test_"))
    t.overwrite(spark.createDataFrame([(1, 10.0), (2, 20.0)], "k long, price double"))
    upd = spark.createDataFrame(
        [(2, 25.0, "CORRECTED"), (3, 30.0, "LATE")], "k long, price double, ch string"
    )
    # evolution must be opt-in
    try:
        t.merge(upd, ["k"])
        raise AssertionError("schema drift merged without merge_schema")
    except Exception as e:  # noqa: BLE001
        assert not isinstance(e, AssertionError)
    # source missing a target column must refuse (replace-row would null it)
    try:
        t.merge(upd.drop("price"), ["k"], merge_schema=True)
        raise AssertionError("partial source accepted")
    except ValueError:
        pass
    t.merge(upd, ["k"], merge_schema=True)
    got = {r["k"]: (r["price"], r["ch"]) for r in t.read().collect()}
    assert got == {1: (10.0, None), 2: (25.0, "CORRECTED"), 3: (30.0, "LATE")}


def test_lttb_keeps_endpoints_and_extremes(spark):
    import pandas as pd

    from retail_datalakehouse_spark.operators.downsample import lttb_pandas

    # a spike at x=50 must survive any sensible downsample
    rows = [(x, 100 * 100) for x in range(100)]
    rows[50] = (50, 10000 * 100)
    pdf = pd.DataFrame(rows, columns=["x", "cents"])
    out = lttb_pandas(pdf, "x", "cents", buckets=6)
    xs = list(out["x"])
    assert xs[0] == 0 and xs[-1] == 99  # endpoints always kept
    assert 50 in xs  # the spike is kept
    assert list(out["sel_idx"]) == list(range(6))
    # short series pass through whole
    short = pd.DataFrame([(1, 100), (2, 200)], columns=["x", "cents"])
    assert len(lttb_pandas(short, "x", "cents", buckets=6)) == 2


def test_unique_constraint_lifecycle(spark):
    from retail_datalakehouse_spark.sources.constraints import UniqueViolation
    from retail_datalakehouse_spark.sources.table_format import VersionedTable

    t = VersionedTable(spark, tempfile.mkdtemp(prefix="rdl_uq_test_"))
    t.overwrite(spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"))
    # existing snapshot must already be unique
    t2 = VersionedTable(spark, tempfile.mkdtemp(prefix="rdl_uq_dup_"))
    t2.overwrite(spark.createDataFrame([(1, "a"), (1, "b")], "k long, v string"))
    try:
        t2.add_unique("pk", ["k"])
        raise AssertionError("added UNIQUE over duplicate data")
    except UniqueViolation:
        pass
    t.add_unique("pk", ["k"])
    try:
        t.add_unique("pk", ["v"])
        raise AssertionError("duplicate constraint name accepted")
    except ValueError:
        pass
    # constraint survives unrelated commits (carried by the manifest)
    t.append(spark.createDataFrame([(3, "c")], "k long, v string"))
    try:
        t.append(spark.createDataFrame([(3, "dup")], "k long, v string"))
        raise AssertionError("duplicate published after a carry commit")
    except UniqueViolation:
        pass
    # merge on an existing key replaces, never duplicates -> legal
    t.merge(spark.createDataFrame([(3, "c2")], "k long, v string"), ["k"])
    assert {r["v"] for r in t.read().filter("k = 3").collect()} == {"c2"}
    # drop lifts enforcement
    t.drop_unique("pk")
    t.append(spark.createDataFrame([(3, "now-legal")], "k long, v string"))
    assert t.read().filter("k = 3").count() == 2


def test_default_columns_contract(spark):
    from retail_datalakehouse_spark.sources.table_format import VersionedTable

    t = VersionedTable(spark, tempfile.mkdtemp(prefix="rdl_dflt_test_"))
    t.overwrite(spark.createDataFrame([(1, 10.0)], "k long, price double"))
    t.add_default("channel", "'STORE'")
    # backfill materialized the new column into existing rows
    assert t.read().filter("k = 1").first()["channel"] == "STORE"
    # absent column fills; explicit value kept; explicit NULL stays NULL
    t.append(spark.createDataFrame([(2, 20.0)], "k long, price double"))
    t.append(
        spark.createDataFrame([(3, 30.0, "WEB")], "k long, price double, channel string")
    )
    t.append(
        spark.createDataFrame(
            [(4, 40.0, None)], "k long, price double, channel string"
        )
    )
    got = {r["k"]: r["channel"] for r in t.read().collect()}
    assert got == {1: "STORE", 2: "STORE", 3: "WEB", 4: None}
    # generated columns refuse defaults; double-add refuses
    try:
        t.add_default("channel", "'X'")
        raise AssertionError("double default accepted")
    except ValueError:
        pass
    t.drop_default("channel")
    t.append(spark.createDataFrame([(5, 50.0)], "k long, price double"), merge_schema=True)
    assert t.read().filter("k = 5").first()["channel"] is None


def test_pass_at_k_matches_exact_combinatorics(spark):
    import math

    df = spark.createDataFrame(
        [(n, c) for n in range(5, 15) for c in range(0, n + 1)], "n long, c long"
    )
    from pyspark.sql import functions as F

    n, c = F.col("n"), F.col("c")
    prod = (
        ((n - c - 0).cast("double") / (n - 0))
        * ((n - c - 1).cast("double") / (n - 1))
        * ((n - c - 2).cast("double") / (n - 2))
        * ((n - c - 3).cast("double") / (n - 3))
        * ((n - c - 4).cast("double") / (n - 4))
    )
    got = {
        (r["n"], r["c"]): r["p5"]
        for r in df.select(
            "n", "c",
            F.when(n - c >= 5, F.lit(1.0) - prod).otherwise(F.lit(1.0)).alias("p5"),
        ).collect()
    }
    for (nn, cc), v in got.items():
        exact = 1.0 - math.comb(nn - cc, 5) / math.comb(nn, 5) if nn - cc >= 5 else 1.0
        assert abs(v - exact) < 1e-12, (nn, cc, v, exact)


def test_rouge_identical_pair_is_perfect(spark):
    # doc 0 and doc 1 are identical -> clipped bigram overlap = total,
    # so precision == recall == 1 for both directions
    from pyspark.sql import functions as F

    d = spark.createDataFrame(
        [(0, "a b c a b"), (1, "a b c a b")], "doc_id long, text string"
    )
    toks = F.split("text", " ")
    nn = F.size(toks)
    bg = d.select(
        "doc_id",
        F.explode(
            F.zip_with(
                F.slice(toks, 1, nn - 1), F.slice(toks, 2, nn - 1),
                lambda a, b: F.concat(a, F.lit(" "), b),
            )
        ).alias("g"),
    ).groupBy("doc_id", "g").count()
    rows = {(r["doc_id"], r["g"]): r["count"] for r in bg.collect()}
    # multiset clipping: "a b" occurs twice on each side -> overlap counts 2
    a = {g: c for (i, g), c in rows.items() if i == 0}
    b = {g: c for (i, g), c in rows.items() if i == 1}
    overlap = sum(min(c, b.get(g, 0)) for g, c in a.items())
    assert overlap == sum(a.values()) == sum(b.values()) == 4
    assert a["a b"] == 2  # the repeated bigram is clipped at 2, not 1


def test_cdc_scd2_double_update_yields_three_intervals(spark):
    import tempfile as _tf

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from retail_datalakehouse_spark.sources.table_format import VersionedTable

    t = VersionedTable(
        spark, _tf.mkdtemp(prefix="rdl_cdc2_test_"), record_cdf=True, cdf_keys=["k"]
    )
    t.append(spark.createDataFrame([(1, "A")], "k long, seg string"))
    t.merge(spark.createDataFrame([(1, "B")], "k long, seg string"), ["k"])
    t.merge(spark.createDataFrame([(1, "C")], "k long, seg string"), ["k"])
    vs = sorted(t._versions())
    log = None
    for prev, v in zip([0, *vs[:-1]], vs):
        feed = t.changes_feed(prev, v).withColumn("v", F.lit(v))
        log = feed if log is None else log.unionByName(feed)
    events = log.filter(F.col("_change_type") != "update_preimage")
    scd = events.withColumn(
        "to_v", F.lead("v").over(Window.partitionBy("k").orderBy("v"))
    ).collect()
    ivs = sorted((r["seg"], r["v"], r["to_v"]) for r in scd)
    assert [s for s, _, _ in ivs] == ["A", "B", "C"]
    # chain closes correctly: A closed by B's version, B by C's, C open
    assert ivs[0][2] == ivs[1][1] and ivs[1][2] == ivs[2][1] and ivs[2][2] is None
