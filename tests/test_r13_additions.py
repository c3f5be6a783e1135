"""Round-13 additions: pins for the r12 advisor findings on the Iceberg
interop surface (field-id stability under schema evolution, schema-id
resolution on import, independent bounds maps, dead-manifest pruning)
and the id-domain-safe t32 sentinel filter."""

import json
import os
import tempfile

from pyspark.sql import functions as F

from retail_datalakehouse_spark.sources.iceberg_import import (
    iceberg_snapshot_summary,
    load_table_metadata,
    read_iceberg_snapshot,
)
from retail_datalakehouse_spark.sources.table_format import VersionedTable


def test_iceberg_export_schema_evolution_stable_field_ids(spark):
    """Adding a column between exports must NOT re-mint field ids or
    overwrite the schemas list: prior snapshots keep resolving against
    the schema they were written with (their own schema-id), existing
    columns keep their original ids (Iceberg's field-id stability
    contract), and the new column gets a FRESH id."""
    root = tempfile.mkdtemp(prefix="rdl_ice_evo_")
    t = VersionedTable(spark, root)
    t.overwrite(spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"))
    t.export_iceberg_metadata()
    m1 = load_table_metadata(root)
    snap1 = m1["current-snapshot-id"]
    assert m1["current-schema-id"] == 0
    assert [f["id"] for f in m1["schemas"][0]["fields"]] == [1, 2]

    # evolve: new column via ADD COLUMN ... DEFAULT (materializing)
    t.add_default("extra", "42")
    t.export_iceberg_metadata()
    m2 = load_table_metadata(root)

    # schemas RETAINED + appended; snapshots stamped with their schema-id
    assert [s["schema-id"] for s in m2["schemas"]] == [0, 1]
    assert m2["current-schema-id"] == 1
    by_id = {s["snapshot-id"]: s for s in m2["snapshots"]}
    assert by_id[snap1]["schema-id"] == 0
    assert by_id[m2["current-snapshot-id"]]["schema-id"] == 1

    # field ids STABLE for old columns, fresh for the new one
    new_schema = m2["schemas"][1]
    ids = {f["name"]: f["id"] for f in new_schema["fields"]}
    assert ids["k"] == 1 and ids["v"] == 2 and ids["extra"] == 3
    assert m2["last-column-id"] == 3
    persisted = json.loads(m2["properties"]["rdl.field-ids"])
    assert persisted == {"k": 1, "v": 2, "extra": 3}

    # time travel reads the OLD snapshot under the OLD schema
    old = read_iceberg_snapshot(spark, root, snapshot_id=snap1)
    assert old.columns == ["k", "v"]
    cur = read_iceberg_snapshot(spark, root)
    assert cur.columns == ["k", "v", "extra"]
    assert sorted(r["extra"] for r in cur.collect()) == [42, 42]


def test_iceberg_export_drops_dead_manifests(spark):
    """A prior manifest whose entries are ALL DELETED must not be carried
    forward by reference: before the fix every later export re-appended
    it with zero counts, growing the manifest list forever."""
    root = tempfile.mkdtemp(prefix="rdl_ice_dead_")
    t = VersionedTable(spark, root)
    t.overwrite(spark.createDataFrame([(1, "a")], "k long, v string"))
    t.export_iceberg_metadata()
    # full replacement kills every file of the first export's manifest
    t.overwrite(spark.createDataFrame([(2, "b")], "k long, v string"))
    t.export_iceberg_metadata()
    t.append(spark.createDataFrame([(3, "c")], "k long, v string"))
    t.export_iceberg_metadata()

    meta = load_table_metadata(root)
    cur = next(
        s for s in meta["snapshots"]
        if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    with open(os.path.join(root, cur["manifest-list"])) as fh:
        manifests = json.load(fh)["manifests"]
    # no all-dead manifest survives in the CURRENT list
    assert all(
        m["added_files_count"] + m["existing_files_count"] > 0
        for m in manifests
    ), manifests
    # and the reader agrees on the live rows
    assert read_iceberg_snapshot(spark, root).count() == 2
    # lineage arithmetic still consistent
    lin = iceberg_snapshot_summary(root)["lineage"]
    assert lin[-1]["live_rows"] == 2


def test_iceberg_bounds_maps_are_independent(spark):
    """lower_bounds / upper_bounds omit columns whose specific bound is
    null — never write a null bound, never drop a present one because
    its partner is missing."""
    root = tempfile.mkdtemp(prefix="rdl_ice_bnd_")
    t = VersionedTable(spark, root)
    t.overwrite(spark.createDataFrame([(1, "a")], "k long, v string"))
    rel = t._delta_file_list(t._manifest(t.current_version()))[0]["__rel"]
    fake = {
        "__rel": rel,
        "n_rows": 1,
        "stats": {"a": (None, 5), "b": (1, None), "c": (1, 2)},
    }
    df = t._iceberg_data_file(fake, {"a": 1, "b": 2, "c": 3})
    assert df["lower_bounds"] == {"2": 1, "3": 1}
    assert df["upper_bounds"] == {"1": 5, "3": 2}


def test_t32_keeps_event_id_zero(spark):
    """The sentinel filter is id-domain-safe: event_id 0 is a legitimate
    row and must survive (sentinels are strictly negative)."""
    from retail_datalakehouse_spark.queries import REGISTRY

    src = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    d = tempfile.mkdtemp(prefix="rdl_t32_zero_")
    # rebase ids so a purchase lands on event_id 0
    pid0 = (
        src.filter(F.col("event_type") == "purchase")
        .select(F.min("event_id"))
        .first()[0]
    )
    src.withColumn("event_id", F.col("event_id") - F.lit(pid0)).write.mode(
        "overwrite"
    ).parquet(os.path.join(d, "events.parquet"))
    for name in (
        "region nation customer supplier part orders lineitem "
        "documents embeddings".split()
    ):
        p = f"/root/testdata/sf0.001/{name}.parquet"
        if os.path.exists(p):
            os.symlink(p, os.path.join(d, f"{name}.parquet"))
    out = REGISTRY["t32_stream_outer_join"].fn(spark, d)
    rows = {r["pid"]: r["n_clicks_before"] for r in out.collect()}
    assert 0 in rows  # the zero-id purchase emitted
    assert min(rows) == 0  # and nothing negative leaked through


def test_auc_average_rank_ties_match_bruteforce(spark):
    """The doubled-rank AUC identity must equal the brute-force pairwise
    definition (ties count 1/2) on a small contrived set with heavy
    ties."""
    import itertools

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rows = [  # (score, label) with ties across and within classes
        (5, 1), (5, 0), (5, 1), (3, 0), (3, 1), (2, 0), (2, 0), (9, 1),
        (1, 0), (9, 0),
    ]
    pos = [s for s, y in rows if y == 1]
    neg = [s for s, y in rows if y == 0]
    brute = sum(
        1.0 if p > n_ else (0.5 if p == n_ else 0.0)
        for p, n_ in itertools.product(pos, neg)
    ) / (len(pos) * len(neg))

    df = spark.createDataFrame(rows, "score long, pos int")
    g = df.groupBy("score").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("pos").alias("np")
    )
    w = Window.orderBy("score")
    r = g.select(
        "score", "cnt", "np",
        (F.sum("cnt").over(w) - F.col("cnt")).alias("cum_before"),
    )
    out = r.agg(
        F.sum("np").alias("n_pos"),
        F.sum(F.col("cnt") - F.col("np")).alias("n_neg"),
        F.sum(F.col("np") * (2 * F.col("cum_before") + F.col("cnt") + 1)).alias(
            "r2"
        ),
    ).first()
    auc = (out["r2"] - out["n_pos"] * (out["n_pos"] + 1)) / (
        2.0 * out["n_pos"] * out["n_neg"]
    )
    assert abs(auc - brute) < 1e-12


def test_bollinger_integer_test_equals_float_band():
    """(n*x - s)^2 > 4*(n*s2 - s^2) must agree with |x - mu| > 2*sigma
    (population sigma over the window) for every window of a small
    series — including exact-boundary refusals on both sides."""
    import math

    series = [4, 4, 4, 4, 8, 0, 4, 12, 4, 4, 6, 2, 100, 4, 4]
    n_w = 5
    for i in range(n_w - 1, len(series)):
        win = series[i - n_w + 1 : i + 1]
        x = win[-1]
        n, s, s2 = len(win), sum(win), sum(v * v for v in win)
        int_breach = (n * x - s) ** 2 > 4 * (n * s2 - s * s)
        mu = s / n
        sigma = math.sqrt(s2 / n - mu * mu)
        float_breach = abs(x - mu) > 2 * sigma + 1e-9  # strict, off-boundary
        on_boundary = abs(abs(x - mu) - 2 * sigma) < 1e-9
        if not on_boundary:
            assert int_breach == float_breach, (win, x)
        else:
            assert not int_breach  # strict > : boundary is NOT a breach


def test_mann_kendall_tie_correction_bruteforce():
    """S, tau-b, and var(S) from the grouped tie formulas must match the
    O(n^2) literal definitions on a tied series."""
    xs = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5]
    n = len(xs)
    s = sum(
        (1 if xs[j] > xs[i] else -1 if xs[j] < xs[i] else 0)
        for i in range(n)
        for j in range(i + 1, n)
    )
    from collections import Counter

    t = Counter(xs)
    tie_pairs = sum(c * (c - 1) // 2 for c in t.values())
    tie_var = sum(c * (c - 1) * (2 * c + 5) for c in t.values())
    d1 = n * (n - 1) / 2 - tie_pairs
    d2 = n * (n - 1) / 2
    var_s = (n * (n - 1) * (2 * n + 5) - tie_var) / 18
    # brute tau-b
    import itertools, math

    conc = sum(1 for i, j in itertools.combinations(range(n), 2) if xs[j] > xs[i])
    disc = sum(1 for i, j in itertools.combinations(range(n), 2) if xs[j] < xs[i])
    assert s == conc - disc
    # tau-b: S over the geometric mean of tie-adjusted pair counts;
    # the brute pair total must decompose as conc + disc + tied_pairs
    assert conc + disc + tie_pairs == n * (n - 1) // 2
    tau = s / math.sqrt(d1 * d2)
    assert abs(tau - 0.30510802855858954) < 1e-12  # definitional value
    assert var_s > 0


def test_kaplan_meier_zero_and_censor_conventions(spark):
    """The associative-sum KM: (a) a censored subject reduces the risk
    set but adds no factor; (b) d = n at a step pins survival to 0 from
    that horizon on."""
    from retail_datalakehouse_spark.queries import REGISTRY
    import os, tempfile

    # build a tiny events table: 3 users purchase at day 2, 1 censored
    # at day 10 (never purchases), 1 purchases at day 20
    rows = []
    eid = 0
    for uid, (pday, last) in enumerate(
        [(2, 25), (2, 25), (2, 25), (None, 10), (20, 25)]
    ):
        rows.append((eid, uid, "signup", "2024-01-01 00:00:00"))
        eid += 1
        if pday is not None:
            rows.append(
                (eid, uid, "purchase", f"2024-01-{1 + pday:02d} 00:00:00")
            )
            eid += 1
        rows.append((eid, uid, "view", f"2024-01-{1 + last:02d} 00:00:00"))
        eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts string"
    ).select(
        "event_id", "user_id", "event_type",
        F.col("ts").cast("timestamp").alias("ts"),
        F.lit(1.0).alias("value"), F.lit("{}").alias("props"),
    )
    d = tempfile.mkdtemp(prefix="rdl_km_conv_")
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    out = {
        r["horizon"]: r["survival_e6"]
        for r in REGISTRY["x_kaplan_meier"].fn(spark, d).collect()
    }
    # day 2: 3 of 5 at risk convert -> S = 2/5 = 0.4 at horizons 7 and
    # 14 (the DECIMAL(18,9) ln-quantize can land exp a hair under the
    # exact rational, so floor-e6 may read 399999 — deterministically,
    # the same on both engines; allow the one-ulp-of-grain slack here)
    assert out[7] in (399999, 400000) and out[14] == out[7]
    # day 20: risk set is 1 (censor at 10 removed one), d = n -> S = 0
    assert out[21] == 0


def test_iceberg_partitioned_export(spark):
    """Identity-partitioned hive layouts export a REAL partition spec:
    metadata-borne partition values, typed literal injection on read,
    file-list pruning from metadata alone, spec-change refusal."""
    root = tempfile.mkdtemp(prefix="rdl_ice_part_")
    t = VersionedTable(spark, root)
    df = spark.createDataFrame(
        [(1, 10, "a"), (2, 20, "a"), (3, 30, "b"), (4, 40, "c")],
        "k long, v long, part string",
    )
    t.overwrite(df, partition_by=["part"])
    t.export_iceberg_metadata()
    meta = load_table_metadata(root)
    spec = meta["partition-specs"][0]
    assert [f["name"] for f in spec["fields"]] == ["part"]
    assert spec["fields"][0]["transform"] == "identity"
    assert meta["last-partition-id"] == 1000

    # full read round-trips, partition column included and typed
    full = read_iceberg_snapshot(spark, root)
    assert sorted((r["k"], r["part"]) for r in full.collect()) == [
        (1, "a"), (2, "a"), (3, "b"), (4, "c"),
    ]

    # metadata pruning: the filter cuts the FILE LIST before any read
    pruned = read_iceberg_snapshot(spark, root, partition_filter={"part": "a"})
    assert sorted(r["k"] for r in pruned.collect()) == [1, 2]
    srcs = [
        f for f in pruned.inputFiles()
    ]
    assert all("part=a" in s for s in srcs), srcs  # only a's files touched

    # append keeps the layout; incremental export carries spec forward
    t.append(spark.createDataFrame([(5, 50, "b")], "k long, v long, part string"))
    t.export_iceberg_metadata()
    again = read_iceberg_snapshot(spark, root, partition_filter={"part": "b"})
    assert sorted(r["k"] for r in again.collect()) == [3, 5]

    # manifest entries carry the partition values
    meta2 = load_table_metadata(root)
    cur = next(
        s for s in meta2["snapshots"]
        if s["snapshot-id"] == meta2["current-snapshot-id"]
    )
    with open(os.path.join(root, cur["manifest-list"])) as fh:
        mlist = json.load(fh)["manifests"]
    vals = set()
    for m in mlist:
        with open(os.path.join(root, m["manifest_path"])) as fh:
            for e in json.load(fh)["entries"]:
                if e["status"] != 2:
                    vals.add(e["data_file"]["partition"]["part"])
    assert vals == {"a", "b", "c"}

    # spec CHANGE between exports refuses (partition evolution unsupported)
    t.overwrite(df, partition_by=["part", "v"])
    try:
        t.export_iceberg_metadata()
        raise AssertionError("spec change should refuse")
    except ValueError:
        pass


def test_export_delta_log_partitioned(spark):
    """Identity-partitioned hive layouts export real Delta
    partitionValues: metadata-borne values (string map per add), typed
    literal injection on read, file-list pruning during log replay,
    partitionColumns-change refusal."""
    from retail_datalakehouse_spark.sources.delta_import import (
        delta_log_summary,
        read_delta_snapshot,
    )

    root = tempfile.mkdtemp(prefix="rdl_dl_part_")
    t = VersionedTable(spark, root)
    df = spark.createDataFrame(
        [(1, 10, "a"), (2, 20, "a"), (3, 30, "b"), (4, 40, "c")],
        "k long, v long, part string",
    )
    t.overwrite(df, partition_by=["part"])
    t.export_delta_log()

    # the log carries partitionColumns + per-add partitionValues
    with open(os.path.join(root, "_delta_log", f"{0:020d}.json")) as fh:
        actions = [json.loads(line) for line in fh]
    md = next(a["metaData"] for a in actions if "metaData" in a)
    assert md["partitionColumns"] == ["part"]
    adds = [a["add"] for a in actions if "add" in a]
    assert {a["partitionValues"]["part"] for a in adds} == {"a", "b", "c"}

    # full read round-trips with the partition column typed + injected
    full = read_delta_snapshot(spark, root)
    assert sorted((r["k"], r["part"]) for r in full.collect()) == [
        (1, "a"), (2, "a"), (3, "b"), (4, "c"),
    ]
    # pruning: only the matching partition's files are opened
    pruned = read_delta_snapshot(spark, root, partition_filter={"part": "a"})
    assert sorted(r["k"] for r in pruned.collect()) == [1, 2]
    assert all("part=a" in p for p in pruned.inputFiles())

    # incremental append keeps the layout, diff commit carries values
    t.append(spark.createDataFrame([(5, 50, "b")], "k long, v long, part string"))
    t.export_delta_log()
    again = read_delta_snapshot(spark, root, partition_filter={"part": "b"})
    assert sorted(r["k"] for r in again.collect()) == [3, 5]
    summary = delta_log_summary(root)
    assert summary["n_commits"] == 2
    assert summary["n_rows_from_stats"] == 5

    # partitionColumns change between exports refuses
    t.overwrite(df, partition_by=["part", "v"])
    try:
        t.export_delta_log()
        raise AssertionError("partitionColumns change should refuse")
    except ValueError:
        pass
