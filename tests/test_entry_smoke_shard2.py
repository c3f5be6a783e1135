"""Registry smoke shard 2/4 — see tests/entry_smoke_util.py."""

from entry_smoke_util import run_smoke_shard


def test_all_queries_run_at_smoke_sf_shard2(spark, sf_dir):
    run_smoke_shard(spark, sf_dir, shard=2, n_shards=4)
