"""Distributed global ranking — the scale-safe replacement for
``Window.orderBy(...)`` with no partition spec.

An unpartitioned window forces ``Exchange SinglePartition`` + a
single-task sort of the whole frame; fine on a 15k-row demo, fatal when
the frame scales with data volume (at 100 TB a per-customer frame is
10^8-10^9 rows). The standard distributed alternative is the two-pass
rank every MPP engine uses (Trino/Presto call it sampled range
partitioning):

1. split the frame into ORDERED BUCKETS along the sort key;
2. a *partitioned* window gives each row its local row_number — every
   sort is per-bucket, size ~rows/N, and N scales with the cluster;
3. per-bucket row counts (a tiny aggregate, one row per bucket) turn
   into cumulative offsets via bounded O(N^2) array arithmetic on one
   packed row — N is derived from ``spark.sql.shuffle.partitions``, a
   config, not a data scale, so even the offset step is free of
   single-partition windows;
4. global rank = local rank + offset of the buckets before mine,
   attached by broadcast join (no shuffle of the data side).

``ntile`` / ``percent_rank`` then become *arithmetic on the rank* (plus
the broadcast total row count) — their SQL definitions are pure
functions of (row_number, total) under a total order, so no window
function is needed at all.

Why explicit literal cutpoints instead of ``repartitionByRange`` +
``spark_partition_id()``: the counts branch and the data branch consume
the same subtree with DIFFERENT column prunings, so the two range
exchanges don't canonicalize equal, ReuseExchange doesn't fire, and
each instantiation re-SAMPLES its range bounds with a different seed —
boundary rows then land in different partitions per branch and the
offsets silently corrupt (observed at sf1 before this design). Here the
bucket id is a pure deterministic function of the ROW (a lexicographic
comparison against literal cutpoints collected once on the driver), so
every branch, every re-evaluation, and every AQE re-plan agrees by
construction. The cutpoints come from one deterministic hash-sample:
the ~128·N key tuples with the SMALLEST xxhash64 values (a distributed
heap top-K — one job, no RNG, no partition dependence, driver memory
bounded by the bucket-count config), tie-broken on the keys themselves
so even hash collisions cannot make it order-dependent. This gives the
same balance guarantee RangePartitioner's reservoir does.

Callers must supply a TOTAL order (tie-broken, null-free sort keys) —
the same requirement the registry's oracles already impose so DuckDB
and Spark cut ntile buckets identically. The helper runs ONE driver
action over the input (the sample collect); when chaining several
ranks over one expensive frame, persist the frame first.

Reference parity: the reference repo has no engine code; this addresses
the VERDICT r13 scale finding on the global-ntile family
(w5 / RFM segmentation / gains deciles).
"""

from __future__ import annotations

from typing import Sequence, Union

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "attach_global_rank",
    "ntile_from_rank",
    "percent_rank_from_rank",
    "sample_cutpoints",
]

_OrderKey = Union[str, tuple]


def _normalize(order_by: Sequence[_OrderKey]) -> list[tuple[str, str]]:
    keys = []
    for o in order_by:
        if isinstance(o, str):
            keys.append((o, "asc"))
        else:
            name, d = o
            d = d.lower()
            if d not in ("asc", "desc"):
                raise ValueError(f"direction must be asc|desc, got {d!r}")
            keys.append((name, d))
    return keys


def _sort_cols(keys: list[tuple[str, str]]) -> list[Column]:
    return [F.col(n).asc() if d == "asc" else F.col(n).desc() for n, d in keys]


def _row_gt_cut(keys: list[tuple[str, str]], cut: tuple) -> Column:
    """row > cutpoint in the (direction-aware) lexicographic total order."""
    (name, d), c = keys[0], F.lit(cut[0])
    head = (F.col(name) > c) if d == "asc" else (F.col(name) < c)
    if len(keys) == 1:
        return head
    return head | ((F.col(name) == c) & _row_gt_cut(keys[1:], cut[1:]))


def _sql_lit(v) -> str:
    """Render a sampled cutpoint component as a Spark SQL literal.
    Raises TypeError for types without a safe rendering (caller falls
    back to the py4j Column builder)."""
    import datetime as _dt
    from decimal import Decimal as _Dec

    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, int):
        return f"{v}L"
    if isinstance(v, float):
        # repr round-trips the exact double; CAST parses it as double
        # directly (a bare decimal literal would parse as DECIMAL)
        return f"CAST('{v!r}' AS DOUBLE)"
    if isinstance(v, _Dec):
        return f"{v:f}BD"
    if isinstance(v, _dt.datetime):
        return f"TIMESTAMP'{v.isoformat(sep=' ')}'"
    if isinstance(v, _dt.date):
        return f"DATE'{v.isoformat()}'"
    if isinstance(v, str):
        if "${" in v:
            # F.expr text passes through Spark's variable substitution
            # (spark.sql.variable.substitute, default on): a '${...}' in a
            # sampled cutpoint would be silently rewritten and the tree
            # would disagree with the _row_gt_cut Column form. Fall back to
            # the py4j Column builder for such values (ADVICE r14).
            raise TypeError("string cutpoint contains '${' (variable substitution)")
        esc = v.replace("\\", "\\\\").replace("'", "\\'")
        return f"'{esc}'"
    raise TypeError(f"no SQL literal rendering for {type(v).__name__}")


def _row_gt_cut_sql(keys: list[tuple[str, str]], cut: tuple) -> str:
    """SQL text of :func:`_row_gt_cut` (same comparison, zero py4j)."""
    (name, d), lit = keys[0], _sql_lit(cut[0])
    col = "`" + name.replace("`", "``") + "`"
    head = f"{col} > {lit}" if d == "asc" else f"{col} < {lit}"
    if len(keys) == 1:
        return f"({head})"
    rest = _row_gt_cut_sql(keys[1:], cut[1:])
    return f"(({head}) OR (({col} = {lit}) AND {rest}))"


def _bucket_expr(keys: list[tuple[str, str]], cutpoints: list[tuple]) -> Column:
    """Bucket id = number of cutpoints strictly below the row in the
    total order, as a BALANCED BINARY SEARCH TREE of nested CASE WHENs
    over the (sorted) cutpoints: O(log N) tuple comparisons per row.

    The r14-baseline form — a chained SUM of N indicator CASE WHENs —
    evaluated all N comparisons per row AND blew the whole-stage-codegen
    64 KB method limit at N=63 ("grows beyond 64 KB" → interpreted
    fallback): measured 3.97 s vs 0.62 s for this tree on the same
    sf0.1 scan (guide §1.2 step 2 / §7.2). Same result by construction:
    a lower-bound binary search over sorted unique cuts returns exactly
    the strict-less count (verified row-for-row against the chain).

    The tree is rendered as ONE SQL string (F.expr), not nested Column
    objects: building ~63 nodes of F.when(...) costs ~2 s of driver-side
    py4j round-trips per call (measured) vs milliseconds for the string.
    Cut values a SQL literal cannot render exactly fall back to the
    Column builder.
    """
    if not cutpoints:
        return F.lit(0)

    try:
        def node_sql(lo: int, hi: int) -> str:
            if lo >= hi:
                return str(lo)
            mid = (lo + hi) // 2
            return (
                f"(CASE WHEN {_row_gt_cut_sql(keys, cutpoints[mid])} "
                f"THEN {node_sql(mid + 1, hi)} ELSE {node_sql(lo, mid)} END)"
            )

        return F.expr(node_sql(0, len(cutpoints)))
    except TypeError:
        pass

    def node(lo: int, hi: int) -> Column:
        if lo >= hi:
            return F.lit(lo)
        mid = (lo + hi) // 2
        return F.when(
            _row_gt_cut(keys, cutpoints[mid]), node(mid + 1, hi)
        ).otherwise(node(lo, mid))

    return node(0, len(cutpoints))


def _sorted_sample(rows: list[tuple], keys: list[tuple[str, str]]) -> list[tuple]:
    import functools

    dirs = [d for _, d in keys]

    def cmp(a: tuple, b: tuple) -> int:
        for x, y, d in zip(a, b, dirs):
            if x == y:
                continue
            lt = x < y
            return (-1 if lt else 1) if d == "asc" else (1 if lt else -1)
        return 0

    return sorted(rows, key=functools.cmp_to_key(cmp))


def _num_buckets(df: DataFrame, num_buckets: int | None) -> int:
    if num_buckets is not None:
        return max(1, int(num_buckets))
    try:
        n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        n = df.sparkSession.sparkContext.defaultParallelism
    # 2x the partition count smooths the hash-collision imbalance of
    # bucket-id -> reducer assignment (some reducers get 2 buckets)
    return max(1, 2 * n)


def _pick_cutpoints(
    sample: list[tuple], keys: list[tuple[str, str]], n_buckets: int
) -> list[tuple]:
    m = len(sample)
    cutpoints: list[tuple] = []
    if m > n_buckets:
        sample = _sorted_sample(sample, keys)
        seen = set()
        for i in range(1, n_buckets):
            c = sample[(m * i) // n_buckets]
            if c not in seen:
                seen.add(c)
                cutpoints.append(c)
    return cutpoints


def sample_cutpoints(
    df: DataFrame,
    orders: Sequence[Sequence[_OrderKey]],
    *,
    num_buckets: int | None = None,
) -> list[list[tuple]]:
    """Derive cutpoints for SEVERAL rank orders over the same frame from
    ONE deterministic sample job (one uniform row subset serves every
    sort order — just re-sorted per key set). Feed each result to
    attach_global_rank(..., cutpoints=...) to skip its per-call sample.
    """
    keyed = [_normalize(o) for o in orders]
    n_buckets = _num_buckets(df, num_buckets)
    union_names: list[str] = []
    for keys in keyed:
        for n, _ in keys:
            if n not in union_names:
                union_names.append(n)
    target = n_buckets * 128
    rows = (
        df.select(F.xxhash64(*union_names).alias("_rp_h"), *union_names)
        .orderBy("_rp_h", *union_names)
        .limit(target)
        .collect()
    )
    out = []
    for keys in keyed:
        idx = [union_names.index(n) + 1 for n, _ in keys]  # +1 skips _rp_h
        sample = [tuple(tuple(r)[i] for i in idx) for r in rows]
        out.append(_pick_cutpoints(sample, keys, n_buckets))
    return out


def attach_global_rank(
    df: DataFrame,
    order_by: Sequence[_OrderKey],
    *,
    rank_col: str = "_grank",
    total_col: str | None = None,
    num_buckets: int | None = None,
    cutpoints: list[tuple] | None = None,
) -> DataFrame:
    """Attach a 1-based global row_number under ``order_by`` (a TOTAL
    order: include a tie-break key; sort keys must be non-null) without
    ever sorting the frame in one task. ``order_by`` entries are column
    names or ``(name, "asc"|"desc")`` tuples. Optionally attaches the
    global row count as ``total_col`` (broadcast) so callers can derive
    ntile / percent_rank arithmetically.

    Cost: one tiny sample collect (a heap top-K driver action), then one
    hash shuffle of the data (each bucket sorts ~rows/N) plus two tiny
    N-row aggregates. The plan contains NO unpartitioned WindowExec and
    no data-sized single-partition exchange — pinned by explain_audit.
    """
    keys = _normalize(order_by)
    sort = _sort_cols(keys)
    names = [n for n, _ in keys]
    n_buckets = _num_buckets(df, num_buckets)

    if cutpoints is None:
        # deterministic hash-sample of key tuples: the target smallest
        # xxhash64 values (uniform subset, pure function of the data —
        # TakeOrderedAndProject, one job, keys tie-break hash collisions)
        target = n_buckets * 128
        sample = [
            tuple(r)[1:]
            for r in df.select(F.xxhash64(*names).alias("_rp_h"), *names)
            .orderBy("_rp_h", *names)
            .limit(target)
            .collect()
        ]
        cutpoints = _pick_cutpoints(sample, keys, n_buckets)

    # Defensive: the binary-search bucket expression requires ascending
    # (direction-aware) cutpoints. _pick_cutpoints already emits them
    # sorted; re-sorting N≈2·partitions tuples is free insurance for
    # caller-supplied lists.
    cutpoints = _sorted_sample(list(cutpoints), keys)
    b = df.withColumn("_rp_b", _bucket_expr(keys, cutpoints))

    local_w = Window.partitionBy("_rp_b").orderBy(*sort)
    local = b.withColumn("_rp_lrank", F.row_number().over(local_w))

    # One row per non-empty bucket — bounded by the bucket-count CONFIG,
    # never by data volume. Bucket ids are pure row functions, so this
    # branch agrees with the data branch under any re-evaluation.
    # counts come from the PRE-window branch on purpose: deriving them
    # from max(local row_number) would let ReuseExchange share the
    # shuffle, but then BOTH consumers pay the per-bucket window sort —
    # measured 1.6x slower than re-scanning the (column-pruned, cheap)
    # source for a map-side partial count. Correctness is identical
    # either way (bucket id is a pure row function).
    #
    # Cumulative offsets AND the grand total from this ONE aggregation:
    # pack the ≤N (bucket, count) rows into a sorted array and do the
    # prefix sums as array arithmetic (O(N^2) on a config-bounded N,
    # one row). The r14-baseline form self-joined `counts` twice more
    # (a broadcast theta-join for offsets + a crossJoin(total)); each
    # extra DataFrame reference RE-EXECUTED the whole counts subtree, so
    # the source was scanned 4x per rank (data, counts, before, total —
    # see plans/r14/x_equi_depth_histogram_before.txt nodes 8/14/25).
    # Guide §2.4: remove redundant passes outright. A constant-key
    # window over counts would also work, but Catalyst constant-folds
    # the partition spec away and re-creates the unpartitioned
    # WindowExec this module exists to eliminate (caught by the plan
    # test).
    counts = b.groupBy("_rp_b").agg(F.count(F.lit(1)).alias("_rp_cnt"))
    packed = counts.agg(
        F.sort_array(F.collect_list(F.struct("_rp_b", "_rp_cnt"))).alias("_rp_a")
    )
    entries = F.transform(
        F.col("_rp_a"),
        lambda e: F.struct(
            e["_rp_b"].alias("_rp_b"),
            F.aggregate(
                F.filter(F.col("_rp_a"), lambda x: x["_rp_b"] < e["_rp_b"]),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x["_rp_cnt"],
            ).alias("_rp_off"),
        ),
    )
    extra: list[Column] = []
    if total_col is not None:
        extra.append(
            F.aggregate(
                F.col("_rp_a"),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x["_rp_cnt"],
            ).alias(total_col)
        )
    offsets = packed.select(F.explode(entries).alias("_rp_e"), *extra).select(
        F.col("_rp_e._rp_b").alias("_rp_b"),
        F.col("_rp_e._rp_off").alias("_rp_off"),
        *([F.col(total_col)] if total_col is not None else []),
    )

    out = local.join(F.broadcast(offsets), "_rp_b").withColumn(
        rank_col, (F.col("_rp_lrank") + F.col("_rp_off")).cast("long")
    )
    return out.drop("_rp_b", "_rp_lrank", "_rp_off")


def ntile_from_rank(rank_col: str, total_col: str, n_buckets: int) -> Column:
    """SQL NTILE(n) as arithmetic on (row_number, total count) under a
    total order: with c rows, the first c % n buckets hold ceil(c/n)
    rows and the rest floor(c/n) — identical to the standard semantics
    DuckDB/Spark implement. Exact for frames up to 2^53 rows (the
    double-floor divisions stay on exact integers below that).
    """
    r = F.col(rank_col).cast("long")
    c = F.col(total_col).cast("long")
    n = F.lit(int(n_buckets))
    base = F.floor(c / n).cast("long")
    rem = (c % n).cast("long")
    thr = rem * (base + F.lit(1))
    big = F.floor((r - F.lit(1)) / (base + F.lit(1))).cast("long") + F.lit(1)
    # The small-bucket branch is unreachable when base == 0 (c < n, so
    # thr == c >= r): CaseWhen never evaluates the untaken division.
    small = rem + F.floor((r - thr - F.lit(1)) / base).cast("long") + F.lit(1)
    return F.when(r <= thr, big).otherwise(small)


def percent_rank_from_rank(rank_col: str, total_col: str) -> Column:
    """SQL PERCENT_RANK under a TOTAL order (rank == row_number when
    there are no ties): (r - 1) / (c - 1), single row -> 0.0. The same
    two exact integers divided once in double — bit-identical to the
    window function's own evaluation.
    """
    r = F.col(rank_col).cast("long")
    c = F.col(total_col).cast("long")
    return F.when(c > 1, (r - F.lit(1)).cast("double") / (c - F.lit(1)).cast("double")).otherwise(
        F.lit(0.0)
    )
