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
    """Every registered query must at least execute at sf0.001 — and emit
    scalar-only top-level columns: the driver's canonicalizer cannot hash
    list cells (r5 red row l4_inverted_index was SQL-oracle; r9 red row
    x_approx_percentiles was rows-only — BOTH classes are pinned here, and
    in tools/check_oracle.py's lint, which now covers rows-only queries).

    r15: the 477-query loop is the parallel test lane's wall-clock FLOOR
    (~10 min alone), so the registry is walked in four shard modules
    (tests/test_entry_smoke_shard*.py — identical coverage, same asserts,
    via entry_smoke_util.run_smoke_shard). This module keeps shard 0 so
    a plain `pytest tests/test_entry.py` still smoke-runs real queries."""
    from entry_smoke_util import run_smoke_shard

    run_smoke_shard(spark, sf_dir, shard=0, n_shards=4)


def test_gate_prefix_is_fully_sql_checked():
    """The driver's correctness gate walks the FIRST ~50 registry entries;
    a rows-only query there spends an externally-hash-checkable slot, so
    the prefix stays SQL-oracled EXCEPT for a deliberately-listed set:
    r9 rotates the five rows-only-by-design queries through the window
    once, so every registry query holds driver evidence (the driver
    records their weaker rows-only check — that record is the point).
    Anything not on the allowlist is still a slot leak."""
    ROWS_ONLY_BY_DESIGN = {
        "l3_sq8_topk",
        "x_approx_percentiles",
        "x_hll_sketch_union",
        "x_pagerank_influence",
        "l4_bpe_tokenize",
    }
    m = _entry_mod()
    oracles = m.oracle_sql()
    prefix = list(m.queries())[:50]
    missing = [n for n in prefix if n not in oracles and n not in ROWS_ONLY_BY_DESIGN]
    assert not missing, f"rows-only queries inside the 50-slot gate prefix: {missing}"


def test_query_index_doc_is_current():
    """QUERIES.md is generated from the registry — every registered name
    must appear (stale docs misreport coverage to reviewers)."""
    m = _entry_mod()
    from pathlib import Path

    with open(Path(__file__).resolve().parents[1] / "QUERIES.md") as f:
        doc = f.read()
    missing = [n for n in m.queries() if f"`{n}`" not in doc]
    assert not missing, f"QUERIES.md stale — run tools/gen_query_index.py: {missing}"
