"""Incremental materialized-view maintenance as a component.

`IncrementalMart` keeps a (dims → count, exact-decimal sum) aggregate of a
``record_cdf`` :class:`VersionedTable` up to date by applying ONLY the
write-time change feed between refreshes — the operational form of the
pattern `x_incremental_mart_cdf` gates:

- the refresh WATERMARK is the mart's own txn state (``txn=("ivm", v)``),
  so a replayed/raced ``refresh()`` is an exactly-once no-op — no side
  metadata files, the same idempotence machinery every other writer uses;
- deltas apply as SIGNED partials through ``merge_aggregate`` (+1 for
  insert/update_postimage, −1 for delete/update_preimage), so refresh
  cost is O(|changes|) at any source size;
- a group whose count returns to zero stays as a zero row internally and
  is filtered at :meth:`read` — the standard IVM treatment of deletable
  groups without rewriting the mart.

At 100 TB: the source emits a few delta files per commit; each refresh
reads only those, shuffles only the touched (dims) groups, and commits
one mart snapshot. The mart never re-reads the source table after the
initial build.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .table_format import VersionedTable


class IncrementalMart:
    def __init__(
        self,
        spark: SparkSession,
        source: VersionedTable,
        path: str,
        dims: list[str],
        measure: str,
    ):
        self.spark = spark
        self.source = source
        self.dims = list(dims)
        self.measure = measure
        self.mart = VersionedTable(spark, path)

    def _aggregate(self, df: DataFrame, sign=None) -> DataFrame:
        s = F.lit(1) if sign is None else sign
        return df.groupBy(*self.dims).agg(
            F.sum(s).cast("long").alias("n_rows"),
            F.sum(s * F.col(self.measure).cast("decimal(25,2)"))
            .cast("decimal(25,2)")
            .alias("m_exact"),
        )

    def refresh(self) -> int:
        """Bring the mart up to the source's current version. First call
        full-builds from the snapshot; later calls apply only the change
        feed since the recorded watermark. Idempotent per source version
        (txn watermark) — calling twice commits once."""
        cur = self.source.current_version()
        if cur is None:
            raise ValueError("source table is empty")
        last = self.mart.last_txn_batch("ivm")
        if last is None:
            base = self._aggregate(self.source.read_version(cur))
            self.mart.overwrite(base)
            # record the watermark through a no-op fold commit so the
            # overwrite + watermark land as one logical initialization
            return self.mart.fold(lambda m: m, op="ivm_init", txn=("ivm", cur))
        if cur == last:
            return self.mart.current_version()  # already current — no-op
        delta = self.source.changes_feed(last, cur)
        sign = F.when(
            F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
        ).otherwise(F.lit(-1))
        partials = self._aggregate(delta, sign=sign)
        return self.mart.merge_aggregate(
            partials,
            keys=self.dims,
            add_cols=["n_rows", "m_exact"],
            txn=("ivm", cur),
        )

    def read(self) -> DataFrame:
        """The mart's current contents: (dims, n_rows, measure as double),
        zero-count groups (fully deleted upstream) filtered out."""
        m = self.mart.read()
        return m.filter(F.col("n_rows") > 0).select(
            *self.dims,
            "n_rows",
            F.round(F.col("m_exact"), 2).cast("double").alias("measure_sum"),
        )
