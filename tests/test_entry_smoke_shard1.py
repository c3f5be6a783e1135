"""Registry smoke shard 1/4 — see tests/entry_smoke_util.py."""

from entry_smoke_util import run_smoke_shard


def test_all_queries_run_at_smoke_sf_shard1(spark, sf_dir):
    run_smoke_shard(spark, sf_dir, shard=1, n_shards=4)
