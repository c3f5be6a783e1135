"""Property tests, shard B — moved verbatim from test_properties.py so the
parallel test lane (tools/fast_tests.py, module-granular) can run the two
halves concurrently; test_properties.py alone was the lane's wall-clock
floor (~9.5 min). Same tests, same strategies, same asserts."""

from __future__ import annotations

from hypothesis import given
from hypothesis import strategies as st

from pyspark.sql import Window
from pyspark.sql import functions as F

from test_properties import SETTINGS

@given(
    vals=st.lists(st.floats(-100, 100, allow_nan=False, width=32), min_size=0, max_size=25),
    w=st.sampled_from([0.3, 1.0, 2.5]),
)
@SETTINGS
def test_binned_band_join_matches_naive(spark, vals, w):
    """The floor(v/w) bin rewrite of |a-b| <= w finds EXACTLY the naive
    theta-join pairs for arbitrary values and band widths (adjacent-bin
    coverage is sufficient and non-duplicating)."""
    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)] or [(0, 0.0)], ["k", "v"]
    )
    binned = df.withColumn("bin", F.floor(F.col("v") / w).cast("long"))
    probes = binned.withColumn(
        "pb", F.explode(F.array(F.col("bin") - 1, F.col("bin"), F.col("bin") + 1))
    ).select(F.col("k").alias("k1"), F.col("v").alias("v1"), "pb")
    build = binned.select(F.col("k").alias("k2"), F.col("v").alias("v2"), "bin")
    fast = {
        (r["k1"], r["k2"])
        for r in probes.join(build, probes.pb == build.bin)
        .filter((F.col("k1") < F.col("k2")) & (F.abs(F.col("v1") - F.col("v2")) <= w))
        .collect()
    }
    naive = {
        (i, j)
        for i, a in enumerate(vals)
        for j, b in enumerate(vals)
        if i < j and abs(a - b) <= w
    }
    assert fast == naive


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 10), st.integers(1, 100)), min_size=1, max_size=30
    ),
    n_batches=st.integers(1, 4),
)
@SETTINGS
def test_merge_additive_partials_equal_direct_agg(spark, rows, n_batches):
    """Splitting the input into ANY batches, partially aggregating each,
    and folding them with merge_additive must equal the direct aggregate
    — the invariant behind t9's streamed mart refresh."""
    from retail_datalakehouse_spark.operators.merge import merge_additive

    df = spark.createDataFrame([(k, v) for k, v in rows], ["k", "v"])
    direct = {
        (r["k"]): (r["n"], r["s"])
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
        .collect()
    }
    acc = None
    for i in range(n_batches):
        batch = df.filter((F.col("v") % n_batches) == i)
        partial = batch.groupBy("k").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
        )
        acc = partial if acc is None else merge_additive(acc, partial, ["k"], ["n", "s"])
    folded = {(r["k"]): (r["n"], r["s"]) for r in acc.collect()}
    assert folded == direct


@given(
    pts=st.lists(
        st.tuples(st.integers(0, 20), st.integers(0, 20)), min_size=1, max_size=25
    )
)
@SETTINGS
def test_skyline_window_rewrite_equals_naive_domination(spark, pts):
    """The two-window skyline must keep exactly the non-dominated points
    (dominated: another point >= in both dims, > in at least one)."""
    df = spark.createDataFrame(
        [(i, d, p) for i, (d, p) in enumerate(pts)], ["id", "day", "price"]
    )
    w_later = Window.orderBy(F.col("day").desc()).rangeBetween(
        Window.unboundedPreceding, -1
    )
    w_same = Window.partitionBy("day")
    got = {
        r["id"]
        for r in df.withColumn("ml", F.max("price").over(w_later))
        .withColumn("ms", F.max("price").over(w_same))
        .filter(
            (F.col("ml").isNull() | (F.col("ml") < F.col("price")))
            & (F.col("ms") <= F.col("price"))
        )
        .collect()
    }
    naive = {
        i
        for i, (d, p) in enumerate(pts)
        if not any(
            (d2 >= d and p2 >= p and (d2 > d or p2 > p)) for (d2, p2) in pts
        )
    }
    assert got == naive


@given(
    events=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 10000)), min_size=1, max_size=30
    )
)
@SETTINGS
def test_sessionization_partitions_events_at_gaps(spark, events):
    """Session assignment must partition each user's events into runs
    split exactly where the gap exceeds the threshold (here 100 units),
    and session bounds must equal the run min/max."""
    gap = 100
    df = spark.createDataFrame(
        [(u, t, i) for i, (u, t) in enumerate(events)], ["u", "t", "eid"]
    )
    w = Window.partitionBy("u").orderBy("t", "eid")
    g = df.withColumn(
        "new_sess",
        F.when(
            F.lag("t").over(w).isNull() | ((F.col("t") - F.lag("t").over(w)) > gap), 1
        ).otherwise(0),
    ).withColumn(
        "sid", F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    got = {
        (r["u"], r["sid"]): (r["lo"], r["hi"], r["n"])
        for r in g.groupBy("u", "sid")
        .agg(F.min("t").alias("lo"), F.max("t").alias("hi"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # python reference: sort each user's times, split at gaps
    from collections import defaultdict

    by_user = defaultdict(list)
    for i, (u, t) in enumerate(events):
        by_user[u].append((t, i))
    want = {}
    for u, ts in by_user.items():
        ts.sort()
        sid = 0
        runs = []
        for j, (t, _) in enumerate(ts):
            if j == 0 or t - ts[j - 1][0] > gap:
                sid += 1
                runs.append([t, t, 1])
            else:
                runs[-1][1] = t
                runs[-1][2] += 1
        for s, (lo, hi, n) in enumerate(runs, start=1):
            want[(u, s)] = (lo, hi, n)
    assert got == want


EDGES = st.lists(
    st.tuples(st.integers(0, 14), st.integers(0, 14)), min_size=0, max_size=25
)


@given(edges=EDGES)
@SETTINGS
def test_connected_components_paths_match_bfs_reference(spark, edges):
    """On arbitrary graphs (self-loops, multi-edges, duplicates included),
    the driver-side union-find path and the distributed min-label loop
    must both equal a pure-Python BFS min-label reference."""
    from retail_datalakehouse_spark.operators.graph import connected_components

    n = 15
    nodes_df = spark.createDataFrame([(i,) for i in range(n)], ["id"])
    edges_df = spark.createDataFrame(edges or [(0, 0)], ["src", "dst"])

    adj = {i: set() for i in range(n)}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    ref = {}
    for start in range(n):
        if start in ref:
            continue
        seen = {start}
        stack = [start]
        while stack:
            v = stack.pop()
            for u in adj[v]:
                if u not in seen:
                    seen.add(u)
                    stack.append(u)
        m = min(seen)
        for v in seen:
            ref[v] = m

    local = {
        r.id: r.component for r in connected_components(nodes_df, edges_df).collect()
    }
    dist = {
        r.id: r.component
        for r in connected_components(
            nodes_df, edges_df, driver_edge_threshold=None
        ).collect()
    }
    assert local == ref
    assert dist == ref


@given(
    members=st.lists(st.integers(min_value=-(2**62), max_value=2**62), max_size=60),
)
@SETTINGS
def test_bloom_membership_property(spark, members):
    """For ANY hash multiset, every inserted value must probe true on the
    Spark side (build/probe bit-parity across the Python/JVM boundary is
    the invariant that makes the decontamination pre-screen lossless)."""
    from retail_datalakehouse_spark.operators.bloom import bloom_probe, build_bloom

    words = build_bloom(members, m_bits=1 << 12, k=3)
    if not members:
        return
    df = spark.createDataFrame([(h,) for h in members], ["h"])
    n = df.filter(bloom_probe(words, F.col("h"), m_bits=1 << 12, k=3)).count()
    assert n == len(members)


