"""Head-resolution cost vs commit count: listing vs log checkpoint.

Builds a SYNTHETIC manifest directory of N single-commit JSON files (no
parquet, no Spark — this measures pure version resolution: the directory
listing `_versions()` does versus the checkpoint-probe `current_version()`
does), then times head resolution with and without `_last_checkpoint.json`.

At 10^6 commits the listing is a full directory scan PER READ (every
read/commit resolves the head first); the checkpoint probe is
O(commits-since-checkpoint) stat calls — flat in table age.

Usage: python tools/bench_log_checkpoint.py [N ...]   (default 1k 10k 100k)
Prints one JSON line per (N, mode) for SCALE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from retail_datalakehouse_spark.sources import table_format as tf  # noqa: E402


class _HeadOnly(tf.VersionedTable):
    def __init__(self, path: str):
        self.spark = None
        self.path = path
        self._manifest_dir = os.path.join(path, "_manifest")
        self._record_cdf = False
        self._cdf_keys = []
        self._ref_name = None


def build(path: str, n_commits: int) -> None:
    mdir = os.path.join(path, "_manifest")
    os.makedirs(mdir, exist_ok=True)
    for v in range(1, n_commits + 1):
        with open(os.path.join(mdir, f"v{v}.json"), "w") as f:
            json.dump(
                {
                    "version": v,
                    "operation": "append",
                    "parent": v - 1 or None,
                    "n_rows": v,
                    "data_dir": f"_v{v}-synth",
                    "partition_by": None,
                    "cdf_dir": None,
                    "committed_at": 0.0,
                    "modified_keys": [],
                    "txn": {},
                },
                f,
            )


def main() -> None:
    sizes = [int(x) for x in sys.argv[1:]] or [1_000, 10_000, 100_000]
    lag = 10  # commits landed since the last maintenance checkpoint
    for n in sizes:
        d = tempfile.mkdtemp(prefix="rdl_log_bench_")
        try:
            build(d, n)
            t = _HeadOnly(d)
            for mode in ("listing", "checkpoint"):
                if mode == "checkpoint":
                    with open(t._log_checkpoint_path(), "w") as f:
                        json.dump({"version": n - lag}, f)
                best = None
                for _ in range(3):
                    t0 = time.perf_counter()
                    head = t.current_version()
                    dt = time.perf_counter() - t0
                    best = dt if best is None else min(best, dt)
                assert head == n, (head, n)
                print(
                    json.dumps(
                        {
                            "n_commits": n,
                            "mode": mode,
                            "resolve_s": round(best, 6),
                        }
                    )
                )
        finally:
            shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
