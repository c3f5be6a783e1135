"""Shared body of the registry-wide smoke test, sharded so the parallel
test lane can spread the 477-query walk over several worker processes
(tests/test_entry.py::test_all_queries_run_at_smoke_sf runs shard 0;
tests/test_entry_smoke_shard{1,2,3}.py run the rest — identical coverage,
identical asserts)."""

from __future__ import annotations

import importlib


def run_smoke_shard(spark, sf_dir: str, shard: int, n_shards: int) -> None:
    m = importlib.import_module("__spark_entry__")
    names = sorted(m.queries())
    picked = [n for i, n in enumerate(names) if i % n_shards == shard]
    assert picked, f"empty smoke shard {shard}/{n_shards}"
    qs = m.queries()
    for name in picked:
        df = qs[name](spark, sf_dir)
        complex_cols = [
            f"{f.name}:{f.dataType.simpleString()}"
            for f in df.schema.fields
            if f.dataType.typeName() in ("array", "map", "struct", "decimal")
        ]
        assert not complex_cols, f"{name}: driver-unhashable output columns {complex_cols}"
        df.limit(5).collect()  # forces execution of the plan
