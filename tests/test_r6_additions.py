"""Round-6 late additions: duplicate spans, VAD, partition evolution,
integer-exact temperature sampling."""

from __future__ import annotations

import math
import os

from pyspark.sql import functions as F

from retail_datalakehouse_spark.operators.dedup import duplicate_span_stats
from retail_datalakehouse_spark.operators.multimodal import encode_wav, vad_stats
from retail_datalakehouse_spark.sources.table_format import VersionedTable


def _span_rows(spark, docs, n=3):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    return {
        r["doc_id"]: (r["n_spans"], r["n_dup_spans"])
        for r in duplicate_span_stats(df, "doc_id", "text", n=n).collect()
    }


def test_duplicate_spans_cross_doc_and_short_doc(spark):
    got = _span_rows(
        spark,
        [
            (1, "a b c d"),      # spans: "a b c", "b c d"
            (2, "a b c x"),      # spans: "a b c", "b c x"
            (3, "q r"),          # < n words -> 0 spans
        ],
        n=3,
    )
    # "a b c" occurs in docs 1 and 2 -> duplicated at both positions
    assert got[1] == (2, 1)
    assert got[2] == (2, 1)
    assert got[3] == (0, 0)


def test_duplicate_spans_within_same_doc(spark):
    # "a b c" appears twice inside ONE doc: both positions count as dup
    got = _span_rows(spark, [(1, "a b c z a b c")], n=3)
    assert got[1] == (5, 2)


def test_vad_stats_frames_and_segments(spark):
    loud, quiet = 30000, 10
    # frames(4 samples): active, silent, active, active -> 2 segments
    samples = [loud] * 4 + [quiet] * 4 + [loud] * 4 + [loud] * 4 + [quiet]
    payload = encode_wav(samples)
    df = spark.createDataFrame([(1, bytearray(payload))], "doc_id long, payload binary")
    row = vad_stats(df, frame=4, threshold=4 * 20000).collect()[0]
    # the trailing lone sample is dropped (partial frame)
    assert (row["n_frames"], row["n_active"], row["n_segments"]) == (4, 3, 2)


def test_vad_stats_all_silent(spark):
    payload = encode_wav([0] * 16)
    df = spark.createDataFrame([(1, bytearray(payload))], "doc_id long, payload binary")
    row = vad_stats(df, frame=4, threshold=1).collect()[0]
    assert (row["n_active"], row["n_segments"]) == (0, 0)


def test_partition_evolution_layouts_and_isolation(spark, tmp_path):
    df = spark.range(100).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).cast("int").alias("y"),
        (F.col("id") % 12).cast("int").alias("m"),
    )
    t = VersionedTable(spark, str(tmp_path / "pe"))
    t.overwrite(df, partition_by=["y"])
    t.overwrite(df, partition_by=["y", "m"])
    # manifests record each snapshot's own layout
    assert t._manifest(1)["partition_by"] == ["y"]
    assert t._manifest(2)["partition_by"] == ["y", "m"]
    # physical layout is hive-style per version
    d1 = os.path.join(str(tmp_path / "pe"), t._manifest(1)["data_dir"])
    d2 = os.path.join(str(tmp_path / "pe"), t._manifest(2)["data_dir"])
    assert any(p.startswith("y=") for p in os.listdir(d1))
    assert any(p.startswith("m=") for p in os.listdir(os.path.join(d2, "y=0")))
    # both versions read back losslessly (count + key sum)
    for v in (1, 2):
        got = t.read_version(v).agg(
            F.count(F.lit(1)).alias("n"), F.sum("k").alias("s")
        ).collect()[0]
        assert (got["n"], got["s"]) == (100, 4950)
    # manifest row counts survived the partitioned write (os.walk fix)
    assert t._manifest(1)["n_rows"] == 100
    assert t._manifest(2)["n_rows"] == 100
    # the partition filter prunes: only 1/4 of v1's files are scanned
    plan = (
        t.read_version(1).filter(F.col("y") == 2)._jdf.queryExecution()
        .executedPlan().toString()
    )
    assert "y=2" in plan or "PartitionFilters" in plan


def test_partition_evolution_changes_across_layouts(spark, tmp_path):
    df = spark.range(10).select(F.col("id").alias("k"), (F.col("id") % 2).cast("int").alias("y"))
    t = VersionedTable(spark, str(tmp_path / "pec"))
    t.overwrite(df, partition_by=["y"])
    t.overwrite(df.filter(F.col("k") < 8), partition_by=["y"])
    ch = t.changes(1, 2, keys=["k"])
    assert sorted(r["k"] for r in ch.filter(F.col("_change_type") == "delete").collect()) == [8, 9]


def test_isqrt_expr_exact_against_math_isqrt(spark):
    # the +/-1-corrected floor(sqrt) used by l7_temperature_sampling is an
    # exact integer sqrt, including at perfect-square boundaries
    vals = [0, 1, 2, 3, 4, 8, 9, 15, 16, 17, 10**6, 10**6 + 1, 10**12 - 1, 10**12, (2**26 - 1) ** 2]
    from retail_datalakehouse_spark.queries.helpers import isqrt_long

    df = spark.createDataFrame([(v,) for v in vals], "n long")
    got = {row["n"]: row["s"] for row in df.select("n", isqrt_long("n").alias("s")).collect()}
    assert got == {v: math.isqrt(v) for v in vals}


def test_mmr_select_prefers_diverse_over_redundant():
    from retail_datalakehouse_spark.operators.similarity import mmr_select

    # 1 and 2 are near-twins (sim 0.99); 3 is less relevant but diverse.
    rel = {1: 1000000, 2: 990000, 3: 800000}
    sims = {}
    for i, j, s in [(1, 2, 990000), (1, 3, 100000), (2, 3, 120000)]:
        sims[(i, j)] = sims[(j, i)] = s
    # pure relevance would give [1, 2, 3]; MMR (lam=0.7) skips the twin:
    # step 2: cand 2 -> 7*990000-3*990000 = 3960000 < cand 3 -> 7*800000-3*100000 = 5300000
    assert mmr_select(rel, sims, k=3) == [1, 3, 2]


def test_mmr_select_ties_break_on_id_and_k_caps():
    from retail_datalakehouse_spark.operators.similarity import mmr_select

    rel = {5: 100, 2: 100, 9: 100}
    sims = {(i, j): 0 for i in rel for j in rel if i != j}
    assert mmr_select(rel, sims, k=2) == [2, 5]
    assert mmr_select(rel, sims, k=10) == [2, 5, 9]


def test_compact_preserves_partition_layout(spark, tmp_path):
    from retail_datalakehouse_spark.sources.table_format import compact

    df = spark.range(50).select(
        F.col("id").alias("k"), (F.col("id") % 3).cast("int").alias("y")
    )
    t = VersionedTable(spark, str(tmp_path / "cp"))
    t.overwrite(df, partition_by=["y"])
    v = compact(t, target_partitions=2)
    assert t._manifest(v)["partition_by"] == ["y"]
    d = os.path.join(str(tmp_path / "cp"), t._manifest(v)["data_dir"])
    assert any(p.startswith("y=") for p in os.listdir(d))
    got = t.read().agg(F.count(F.lit(1)).alias("n"), F.sum("k").alias("s")).collect()[0]
    assert (got["n"], got["s"]) == (50, 1225)


def test_partitioned_write_is_one_file_per_directory(spark, tmp_path):
    """Optimize-write: a partitioned snapshot gets ONE file per hive dir,
    not (tasks x dirs) small files."""
    df = spark.range(1000).repartition(8).select(
        F.col("id").alias("k"), (F.col("id") % 5).cast("int").alias("y")
    )
    t = VersionedTable(spark, str(tmp_path / "ow"))
    t.overwrite(df, partition_by=["y"])
    base = os.path.join(str(tmp_path / "ow"), t._manifest(1)["data_dir"])
    for part in (p for p in os.listdir(base) if p.startswith("y=")):
        files = [f for f in os.listdir(os.path.join(base, part)) if f.endswith(".parquet")]
        assert len(files) == 1, f"{part}: {files}"
    assert t._manifest(1)["n_rows"] == 1000


def test_changes_feed_matches_diff_based_changes(spark, tmp_path):
    """Write-time recorded deltas composed across versions == the
    snapshot-diff change feed, including all nettings."""
    t = VersionedTable(
        spark, str(tmp_path / "cdf"), record_cdf=True, cdf_keys=["k"]
    )
    t.overwrite(spark.createDataFrame([(i, i * 10) for i in range(10)], ["k", "v"]))
    t.merge(
        # update k=3, no-op update k=5, insert k=12 (deleted below: nets out)
        spark.createDataFrame([(3, 999), (5, 50), (12, 120)], ["k", "v"]),
        keys=["k"],
    )
    t.delete(F.col("k") % 4 == 0)
    feed = sorted(map(tuple, t.changes_feed(1, 3).collect()))
    diff = sorted(map(tuple, t.changes(1, 3, keys=["k"]).collect()))
    assert feed == diff
    types = [r[2] for r in feed]
    assert "update_preimage" in types and "delete" in types
    # k=12: inserted then deleted inside the range -> absent from the net
    assert not any(r[0] == 12 for r in feed)
    # k=5: no-op update -> absent
    assert not any(r[0] == 5 for r in feed)


def test_changes_feed_rejects_unrecorded_versions(spark, tmp_path):
    import pytest

    t = VersionedTable(spark, str(tmp_path / "cdf2"), record_cdf=True, cdf_keys=["k"])
    t.overwrite(spark.createDataFrame([(1, 1)], ["k", "v"]))
    t.overwrite(spark.createDataFrame([(2, 2)], ["k", "v"]))  # overwrite: no feed
    with pytest.raises(ValueError, match="no recorded change feed"):
        t.changes_feed(1, 2)


def test_vacuum_expires_cdf_dirs_with_their_versions(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "cdf3"), record_cdf=True, cdf_keys=["k"])
    t.overwrite(spark.createDataFrame([(i, i) for i in range(5)], ["k", "v"]))
    t.merge(spark.createDataFrame([(1, 99)], ["k", "v"]), keys=["k"])  # v2 + feed
    t.delete(F.col("k") == 2)  # v3 + feed
    base = str(tmp_path / "cdf3")
    assert any(d.startswith("_cdf-v2") for d in os.listdir(base))
    removed = t.vacuum(retain_last=1, orphan_retention_s=0)
    # v2's cdf dir expired with its version; v3's (current) survives
    assert any(d.startswith("_cdf-v2") for d in removed)
    assert any(d.startswith("_cdf-v3") for d in os.listdir(base))
    # the surviving feed still serves the last hop
    assert {r["k"] for r in t.changes_feed(2, 3).collect()} == {2}


def test_append_merge_schema_widens_additively(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "ev"), record_cdf=True, cdf_keys=["k"])
    t.overwrite(spark.createDataFrame([(1, "a"), (2, "b")], ["k", "s"]))
    t.append(
        spark.createDataFrame([(3, "c", 7)], ["k", "s", "score"]),
        merge_schema=True,
    )
    cur = {r["k"]: (r["s"], r["score"]) for r in t.read().collect()}
    assert cur == {1: ("a", None), 2: ("b", None), 3: ("c", 7)}
    # time travel: v1 keeps its original, narrower schema
    assert t.read_version(1).columns == ["k", "s"]
    # the recorded feed spans the evolution (old feeds null the new col)
    feed = {r["k"]: r["_change_type"] for r in t.changes_feed(1, 2).collect()}
    assert feed == {3: "insert"}
    # a batch MISSING a column nulls it rather than failing
    t.append(spark.createDataFrame([(4, "d")], ["k", "s"]), merge_schema=True)
    assert {r["k"]: r["score"] for r in t.read().collect()}[4] is None


def test_merge_partial_null_set_value_and_kept_columns(spark):
    from retail_datalakehouse_spark.operators.merge import merge_partial

    t = spark.createDataFrame([(1, "a", 10), (2, "b", 20)], ["k", "s", "v"])
    # update SETS v to NULL for k=1 (legit), inserts k=3 with full row
    u = spark.createDataFrame([(1, "POISON", None), (3, "c", 30)],
                              "k long, s string, v long")
    got = {r["k"]: (r["s"], r["v"]) for r in
           merge_partial(t, u, keys=["k"], set_cols=["v"]).collect()}
    # matched: v set (even to NULL), s KEPT; unmatched target untouched;
    # insert takes the full update row
    assert got == {1: ("a", None), 2: ("b", 20), 3: ("c", 30)}


def test_changes_feed_spans_compaction(spark, tmp_path):
    """compact() on a record_cdf table records an EMPTY delta, so the
    feed composes across maintenance commits instead of erroring."""
    from retail_datalakehouse_spark.sources.table_format import compact

    t = VersionedTable(spark, str(tmp_path / "cc"), record_cdf=True, cdf_keys=["k"])
    t.overwrite(spark.createDataFrame([(i, i) for i in range(6)], ["k", "v"]))
    t.merge(spark.createDataFrame([(1, 99)], ["k", "v"]), keys=["k"])  # v2
    compact(t, target_partitions=2)  # v3: zero logical changes
    t.delete(F.col("k") == 4)  # v4
    feed = sorted(map(tuple, t.changes_feed(1, 4).collect()))
    diff = sorted(map(tuple, t.changes(1, 4, keys=["k"]).collect()))
    assert feed == diff
    assert {r[2] for r in feed} == {"update_preimage", "update_postimage", "delete"}


def test_delete_on_empty_cdf_table_raises_value_error(spark, tmp_path):
    import pytest

    t = VersionedTable(spark, str(tmp_path / "de"), record_cdf=True, cdf_keys=["k"])
    with pytest.raises(ValueError, match="cannot delete from empty table"):
        t.delete(F.col("k") == 1)


def test_augment_stats_non_square(spark):
    import numpy as np

    from retail_datalakehouse_spark.operators.multimodal import augment_stats

    w, h = 6, 4
    payload = bytes(range(w * h * 3))
    df = spark.createDataFrame([(1, bytearray(payload))], "doc_id long, payload binary")
    row = augment_stats(df, w=w, h=h).collect()[0]
    a = np.frombuffer(payload, dtype=np.uint8).reshape(h, w, 3)
    flip, rot = a[:, ::-1, :], np.rot90(a, k=-1)
    assert row["fl_tl"] == int(flip[0, 0, 0])
    assert row["rot_tl"] == int(rot[0, 0, 0])
    assert row["fl_w"] == int((np.arange(1, w + 1) * flip[0, :, 0].astype(np.int64)).sum())
    assert row["rot_w"] == int((np.arange(1, h + 1) * rot[0, :, 0].astype(np.int64)).sum())


def test_merge_partial_preserves_target_column_order(spark):
    from retail_datalakehouse_spark.operators.merge import merge_partial

    t = spark.createDataFrame([(1, "a", 10)], ["k", "s", "v"])
    u = spark.createDataFrame([(1, "z", 99)], ["k", "s", "v"])
    assert merge_partial(t, u, keys=["k"], set_cols=["v"]).columns == ["k", "s", "v"]


def test_python_datasource_partition_planning_and_determinism(spark):
    from retail_datalakehouse_spark.sources.pydatasource import (
        SynthEventsDataSource,
    )

    try:
        spark.dataSource.register(SynthEventsDataSource)
    except Exception:
        pass
    df = spark.read.format("synth_events").option("rows", 100).option("partitions", 4).load()
    assert df.rdd.getNumPartitions() == 4  # the source's own planning
    rows = sorted(map(tuple, df.collect()))
    assert len(rows) == 100 and rows[0][0] == 0 and rows[-1][0] == 99
    # deterministic at ANY parallelism: 1 partition == 4 partitions
    df1 = spark.read.format("synth_events").option("rows", 100).option("partitions", 1).load()
    assert sorted(map(tuple, df1.collect())) == rows


def _mart_state(mart):
    return {
        tuple(r[d] for d in ("g",)): (r["n_rows"], r["measure_sum"])
        for r in mart.read().collect()
    }


def test_incremental_mart_refresh_equals_recompute(spark, tmp_path):
    from retail_datalakehouse_spark.sources.ivm import IncrementalMart

    src = VersionedTable(spark, str(tmp_path / "src"), record_cdf=True, cdf_keys=["k"])
    src.overwrite(
        spark.createDataFrame([(i, i % 3, float(i)) for i in range(12)], ["k", "g", "v"])
    )
    mart = IncrementalMart(spark, src, str(tmp_path / "mart"), dims=["g"], measure="v")
    mart.refresh()  # full build

    # source evolves: update, insert, delete — refresh applies ONLY deltas
    src.merge(spark.createDataFrame([(1, 1, 100.0), (20, 0, 7.0)], ["k", "g", "v"]), keys=["k"])
    src.delete(F.col("k") % 5 == 0)
    v = mart.refresh()
    # replay: same source version -> no new commit
    assert mart.refresh() == v

    expected = {
        (r["g"]): (r["n"], r["s"])
        for r in src.read()
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum(F.col("v").cast("decimal(25,2)")), 2).cast("double").alias("s"))
        .collect()
    }
    got = {g[0]: ns for g, ns in _mart_state(mart).items()}
    assert got == expected


def test_incremental_mart_zero_count_group_disappears(spark, tmp_path):
    from retail_datalakehouse_spark.sources.ivm import IncrementalMart

    src = VersionedTable(spark, str(tmp_path / "src2"), record_cdf=True, cdf_keys=["k"])
    src.overwrite(spark.createDataFrame([(1, 7, 5.0), (2, 8, 6.0)], ["k", "g", "v"]))
    mart = IncrementalMart(spark, src, str(tmp_path / "mart2"), dims=["g"], measure="v")
    mart.refresh()
    src.delete(F.col("g") == 7)  # group 7 fully deleted upstream
    mart.refresh()
    assert {g[0] for g in _mart_state(mart)} == {8}
