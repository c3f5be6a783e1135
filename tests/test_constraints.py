"""Write-time CHECK constraints + quarantine."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from retail_datalakehouse_spark.sources.constraints import (
    ConstraintViolation,
    enforce,
    quarantine,
    violation_counts,
)

def RULES():
    # built lazily — Column construction needs an active SparkContext
    return {
        "id_not_null": F.col("id").isNotNull(),
        "v_positive": F.col("v") > 0,
    }


@pytest.fixture()
def dirty(spark):
    return spark.createDataFrame(
        [(1, 5.0), (None, 3.0), (3, -1.0), (None, -2.0)], ["id", "v"]
    )


def test_violation_counts_one_row_per_rule(spark, dirty):
    got = {r.constraint: (r.n_bad, r.n_total) for r in violation_counts(dirty, RULES()).collect()}
    assert got == {"id_not_null": (2, 4), "v_positive": (2, 4)}


def test_enforce_raises_with_rule_names(spark, dirty):
    with pytest.raises(ConstraintViolation, match="id_not_null"):
        enforce(dirty, RULES())
    clean = dirty.filter(F.col("id").isNotNull() & (F.col("v") > 0))
    assert enforce(clean, RULES()) is clean


def test_quarantine_tags_every_failed_rule(spark, dirty):
    valid, bad = quarantine(dirty, RULES())
    assert [tuple(r) for r in valid.collect()] == [(1, 5.0)]
    tags = {tuple(sorted(r.failed_constraints)) for r in bad.collect()}
    assert ("id_not_null", "v_positive") in tags  # the doubly-bad row
    assert bad.count() == 3
