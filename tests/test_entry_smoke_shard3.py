"""Registry smoke shard 3/4 — see tests/entry_smoke_util.py."""

from entry_smoke_util import run_smoke_shard


def test_all_queries_run_at_smoke_sf_shard3(spark, sf_dir):
    run_smoke_shard(spark, sf_dir, shard=3, n_shards=4)
