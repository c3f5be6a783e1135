"""Upsert / MERGE (SURVEY §2.1 S7).

The reference ships a 47-row correction file
(``/root/reference/datasets/orders_2024-06-06-Updated.csv``) whose rows all
match existing ``order_id`` values with changed ``total_amount`` — the
canonical silver-zone MERGE fixture (SURVEY §1.3). Delta/Iceberg aren't on
this classpath, so the engine uses the idiomatic Spark rewrite:

    merged = target.join(updates, key, "left_anti").unionByName(updates)

Semantics: update matched keys, insert unmatched — exactly
``MERGE WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *``.

Scale notes: the anti-join shuffles on the merge key (or broadcasts when the
update batch is small — correction files usually are, 47 rows vs 2,248 in
the reference). For table persistence, `merge_into_path` writes the merged
result to a temp location then swaps — the write-temp-then-rename pattern
that keeps the operation atomic-ish without a transactional table format.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    broadcast_updates: bool = True,
) -> DataFrame:
    """Pure-DataFrame MERGE: rows of ``target`` whose key appears in
    ``updates`` are replaced by the update row; new keys are inserted.

    ``updates`` must be unique per key (enforce upstream with
    ``dedup.dedup_keep_first`` for CDC streams carrying multiple versions).
    """
    keys = list(keys)
    upd = F.broadcast(updates) if broadcast_updates else updates
    kept = target.join(upd.select(*keys), on=keys, how="left_anti")
    return kept.unionByName(updates)


def merge_upsert_latest(
    target: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    order_by: Sequence,
) -> DataFrame:
    """Conditional MERGE: ``WHEN MATCHED AND update is newer THEN UPDATE``.

    Unions both sides and keeps the first row per key under ``order_by``
    (names sort ascending; Column expressions pass through — use
    ``F.col("ts").desc()`` for latest-wins). Unlike :func:`merge_upsert`,
    an update that is *older* than the stored row loses — the semantics a
    CDC/event stream needs when micro-batch arrival order is not event
    order. One shuffle on the merge keys.
    """
    from .dedup import dedup_keep_first

    return dedup_keep_first(target.unionByName(updates), keys=keys, order_by=order_by)


def merge_into_path(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    keys: Sequence[str],
    fmt: str = "parquet",
) -> None:
    """MERGE against a stored table: read → merge → write temp → dir-swap.

    The swap is two ``os.rename`` calls (atomic per-call on POSIX): a
    crash between them leaves the target momentarily absent but never
    partial, and the previous snapshot survives at ``__merge_old`` until
    the swap completes. For real multi-writer/multi-reader isolation use
    :class:`..sources.table_format.VersionedTable.merge`, which commits
    through a CAS'd manifest instead of renaming in place.
    """
    import os
    import shutil

    target = spark.read.format(fmt).load(target_path)
    merged = merge_upsert(target, updates, keys)
    base = target_path.rstrip("/")
    tmp, old = base + "__merge_tmp", base + "__merge_old"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)
    merged.write.mode("overwrite").format(fmt).save(tmp)
    os.rename(base, old)
    os.rename(tmp, base)
    shutil.rmtree(old, ignore_errors=True)


def merge_cdc(
    target: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    op_col: str = "op",
    order_by: Sequence[str] = (),
    broadcast_changes: bool = True,
) -> DataFrame:
    """Full CDC fold (S7 extended): apply a change batch containing
    upserts AND deletes.

    ``changes`` rows carry ``op_col`` ∈ {'upsert', 'delete'}. When a key
    appears multiple times in the batch, the LAST change under ``order_by``
    wins (fold within the batch first — deterministic, replay-safe). Then:
    delete tombstones remove the key from the target; upserts replace or
    insert. Single anti-join + union — same shuffle profile as plain MERGE.
    Leave ``broadcast_changes`` True only while the change batch is small
    (CDC correction files); a bulk backfill batch must shuffle, not
    broadcast, or it OOMs the executors.
    """
    from .dedup import dedup_keep_first

    keys = list(keys)
    if order_by:
        # keep the LAST version per key: invert the order via row_number desc
        from pyspark.sql import Window

        w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in order_by])
        changes = (
            changes.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    else:
        changes = dedup_keep_first(changes, keys=keys, order_by=keys)
    change_keys = changes.select(*keys)
    if broadcast_changes:
        change_keys = F.broadcast(change_keys)
    survivors = target.join(change_keys, on=keys, how="left_anti")
    # project upserts onto the target schema (CDC metadata cols dropped)
    inserts = changes.filter(F.col(op_col) == "upsert").select(*target.columns)
    return survivors.unionByName(inserts)


def merge_additive(
    target: DataFrame,
    partials: DataFrame,
    keys: Sequence[str],
    add_cols: Sequence[str],
) -> DataFrame:
    """Additive MERGE for incremental aggregate maintenance: matched keys
    ADD their measure columns (``WHEN MATCHED THEN UPDATE SET c = t.c +
    p.c``), unmatched keys insert. Measures must be partial-mergeable
    (counts, exact-decimal sums, sketch unions would go through their own
    merge fn) — the property that lets a streamed micro-batch refresh a
    materialized aggregate without rescanning history.

    One full-outer join on the aggregate key: at scale the mart is keyed
    and bucketed on ``keys``, so the join co-locates and the update never
    touches more rows than the batch's key set.
    """
    keys = list(keys)
    t = target.alias("t")
    p = partials.alias("p")
    cond = None
    for k in keys:
        # eqNullSafe: a NULL aggregate key must match itself, or the target
        # row and the partial row both survive the full-outer join as two
        # separate rows and the measure is double-counted forever after
        c = F.col(f"t.{k}").eqNullSafe(F.col(f"p.{k}"))
        cond = c if cond is None else (cond & c)
    out_keys = [F.coalesce(F.col(f"t.{k}"), F.col(f"p.{k}")).alias(k) for k in keys]
    out_adds = [
        (
            F.coalesce(F.col(f"t.{c}"), F.lit(0)) + F.coalesce(F.col(f"p.{c}"), F.lit(0))
        ).alias(c)
        for c in add_cols
    ]
    return t.join(p, cond, "full_outer").select(*out_keys, *out_adds)


def merge_partial(
    target: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    set_cols: Sequence[str],
    broadcast_updates: bool = True,
) -> DataFrame:
    """Column-level MERGE (Delta's ``WHEN MATCHED THEN UPDATE SET col = …``
    with an explicit column list): matched rows take ``set_cols`` from the
    update and KEEP every other column from the target; keys absent from
    the target are inserted (columns outside ``set_cols`` + keys must then
    come from the update row too, which therefore carries the full row).

    One left join on the keys — the update batch broadcasts when small
    (the CDC-correction common case), so the target never shuffles.
    ``updates`` must be unique per key, like :func:`merge_upsert`.
    """
    keys, set_cols = list(keys), list(set_cols)
    keep_cols = [c for c in target.columns if c not in keys and c not in set_cols]
    marked = updates.withColumn("__m", F.lit(1))
    upd = F.broadcast(marked) if broadcast_updates else marked
    u, t = upd.alias("u"), target.alias("t")
    # explicit match marker: an update that legitimately SETS a column to
    # NULL must not read as "unmatched" (a value-column null probe would)
    matched = F.col("u.__m").isNotNull()
    matched_or_kept = t.join(u, on=keys, how="left").select(
        *keys,
        *[
            F.when(matched, F.col(f"u.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
            for c in set_cols
        ],
        *[F.col(f"t.{c}").alias(c) for c in keep_cols],
    )
    inserts = u.join(t.select(*keys), on=keys, how="left_anti").select(
        *keys, *[F.col(f"u.{c}").alias(c) for c in (*set_cols, *keep_cols)]
    )
    merged = matched_or_kept.unionByName(inserts.select(*matched_or_kept.columns))
    return merged.select(*target.columns)  # preserve the target's schema order


def merge_sync(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    update_cols: Sequence[str] | None = None,
    delete_unmatched_when: str | None = None,
) -> DataFrame:
    """Full-sync MERGE with Delta's ``WHEN NOT MATCHED BY SOURCE`` clause
    (Delta 2.3+ / SQL:2003 MERGE's third leg — the one plain upserts
    lack): rows matched by key take the source's ``update_cols`` (all
    source columns when None), source-only keys insert, and TARGET rows
    absent from the source — the leg ``merge_upsert`` can't express —
    are DELETED when they meet ``delete_unmatched_when`` (SQL boolean
    over target columns; None keeps them all). This is how a warehouse
    mirrors an operational feed: the feed carries current truth, and
    rows that vanished upstream must be retired ON CONDITION (e.g. only
    finalized ones) without a full overwrite.

    Shape: one left join of target→source on the keys (matched rows
    update in place, unmatched evaluate the delete predicate) + one
    anti-join for inserts — two key shuffles, no window, broadcastable
    source. ``source`` must be unique per key."""
    keys = list(keys)
    upd = list(update_cols) if update_cols is not None else [
        c for c in source.columns if c not in keys
    ]
    # explicit match marker: a legitimately-NULL source value must not
    # read as "not matched by source"
    src = source.select(
        *keys,
        F.lit(1).alias("__src_mark"),
        *[F.col(c).alias(f"__src_{c}") for c in upd],
    )
    joined = target.join(src, on=keys, how="left")
    has_src = F.col("__src_mark").isNotNull()
    # matched: take source values; unmatched-by-source: keep unless the
    # delete predicate holds
    kept = joined if delete_unmatched_when is None else joined.filter(
        has_src | ~F.expr(delete_unmatched_when)
    )
    synced = kept.select(
        *keys,
        *[
            (
                F.when(has_src, F.col(f"__src_{c}")).otherwise(F.col(c))
                if c in upd
                else F.col(c)
            ).alias(c)
            for c in target.columns
            if c not in keys
        ],
    )
    inserts = source.join(target.select(*keys), on=keys, how="left_anti")
    return synced.unionByName(inserts, allowMissingColumns=True)
