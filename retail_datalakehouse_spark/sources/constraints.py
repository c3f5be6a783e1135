"""Write-time constraints + quarantine (Delta CHECK-constraint semantics,
tuned for the reference's defining data traits: the bronze zone is DIRTY —
NULL keys, broken FKs, header drift — SURVEY §1.3).

Two enforcement modes a lakehouse needs:

- ``enforce``: reject the whole batch if any row violates (Delta's
  ``ALTER TABLE ADD CONSTRAINT CHECK`` behavior) — for silver/gold zones
  where bad rows mean a broken upstream, not bad data.
- ``quarantine``: split the batch — valid rows flow on, violating rows
  land in a side table tagged with WHICH constraint failed — for bronze
  ingest where dropping data silently is the real bug.

Both are single-pass column predicates (one scan, no UDF); the violation
counts come from the same pass via conditional aggregation.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class ConstraintViolation(ValueError):
    """Raised by enforce() when a batch contains violating rows."""


class UniqueViolation(ConstraintViolation):
    """Raised when a commit would leave duplicate rows under a declared
    UNIQUE/PRIMARY KEY constraint."""


def enforce_unique(df: DataFrame, uniques: Mapping[str, list[str]]) -> None:
    """Abort if ``df`` (the candidate snapshot) has duplicates under any
    declared key set. One groupBy per key set, short-circuited with
    limit(1) — the shuffle only carries the key columns."""
    for name, cols in uniques.items():
        dup = (
            df.groupBy(*cols)
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > 1)
            .limit(1)
            .collect()
        )
        if dup:
            key = {c: dup[0][c] for c in cols}
            raise UniqueViolation(
                f"unique constraint {name!r} violated: key {key} occurs "
                f"{dup[0]['n']} times in the candidate snapshot"
            )


def _conds(constraints: Mapping[str, Column | str]) -> dict[str, Column]:
    return {
        name: (F.expr(c) if isinstance(c, str) else c) for name, c in constraints.items()
    }


def violation_counts(df: DataFrame, constraints: Mapping[str, Column | str]) -> DataFrame:
    """One row per constraint: (constraint, n_bad, n_total) in one scan."""
    conds = _conds(constraints)
    agg = df.agg(
        F.count(F.lit(1)).alias("n_total"),
        *[
            F.sum(F.when(~c, 1).otherwise(0)).alias(f"__bad_{name}")
            for name, c in conds.items()
        ],
    )
    stacked = agg.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("constraint"),
                        F.col(f"__bad_{name}").cast("long").alias("n_bad"),
                        F.col("n_total").alias("n_total"),
                    )
                    for name in conds
                ]
            )
        ).alias("s")
    )
    return stacked.select("s.constraint", "s.n_bad", "s.n_total")


def enforce(df: DataFrame, constraints: Mapping[str, Column | str]) -> DataFrame:
    """CHECK-constraint gate: raise :class:`ConstraintViolation` naming the
    failed constraints if any row violates; otherwise return ``df``."""
    bad = {
        r.constraint: r.n_bad
        for r in violation_counts(df, constraints).collect()
        if r.n_bad > 0
    }
    if bad:
        raise ConstraintViolation(f"constraint violations: {bad}")
    return df


def quarantine(
    df: DataFrame, constraints: Mapping[str, Column | str]
) -> tuple[DataFrame, DataFrame]:
    """Split into (valid, quarantined). Quarantined rows carry
    ``failed_constraints: array<string>`` naming every violated rule —
    the triage column the bronze-zone operator actually needs."""
    conds = _conds(constraints)
    failed = F.filter(
        F.array(
            *[
                F.when(~c, F.lit(name)).otherwise(F.lit(None)).cast("string")
                for name, c in conds.items()
            ]
        ),
        lambda x: x.isNotNull(),
    )
    tagged = df.withColumn("failed_constraints", failed)
    valid = tagged.filter(F.size("failed_constraints") == 0).drop("failed_constraints")
    bad = tagged.filter(F.size("failed_constraints") > 0)
    return valid, bad
