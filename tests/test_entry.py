"""Driver-contract smoke tests: entry(), queries(), oracle_sql() coherence."""

from __future__ import annotations

import importlib


def _entry_mod():
    return importlib.import_module("__spark_entry__")


def test_entry_runs_and_returns_rows(spark):
    df = _entry_mod().entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"region", "order_month", "revenue", "num_orders", "num_customers"}


def test_registry_contract(spark):
    m = _entry_mod()
    qs = m.queries()
    oracles = m.oracle_sql()
    assert len(qs) >= 20
    # every oracle key must have a query
    assert set(oracles) <= set(qs)
    for name, fn in qs.items():
        assert callable(fn), name


def test_all_queries_run_at_smoke_sf(spark, sf_dir):
    """Every registered query must at least execute at sf0.001."""
    m = _entry_mod()
    for name, fn in m.queries().items():
        df = fn(spark, sf_dir)
        df.limit(5).collect()  # forces execution of the plan
