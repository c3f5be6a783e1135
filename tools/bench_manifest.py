"""Plan-time vs file-count: monolithic inline stats vs chunked manifests.

Builds SYNTHETIC manifests (no parquet I/O — this measures pure planning:
JSON parse + driver pruning math) for a table of N files range-clustered
on `k`, then times the planning half of read_pruned (manifest load +
file-list derivation) for a 0.1%-selectivity range probe.

Usage: python tools/bench_manifest.py [N ...]   (default 1k 10k 100k)
Prints one JSON line per (N, layout) for SCALE.md.
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


class _PlanOnly(tf.VersionedTable):
    """read_pruned's planning half, minus Spark: manifest resolution and
    file-list pruning are exactly the code under test; the DataFrame
    construction is identical for both layouts so it is excluded."""

    def __init__(self, path: str):  # no SparkSession needed for planning
        self.spark = None
        self.path = path
        self._manifest_dir = os.path.join(path, "_manifest")
        self._record_cdf = False
        self._cdf_keys = []
        self._ref_name = None

    def plan_range(self, col: str, lo, hi) -> tuple[int, int]:
        entry = self._manifest(1)  # cold: parse the version JSON each plan
        phys = col
        nlo, nhi = tf._stats_norm(lo), tf._stats_norm(hi)

        def file_keep(f):
            fmin, fmax = f["stats"].get(phys, [None, None])
            return fmin is None or fmax is None or not (fmax < nlo or fmin > nhi)

        kept, n_total = self._planned_files(
            entry, phys, file_keep, lambda clo, chi: not (chi < nlo or clo > nhi)
        )
        return len(kept), n_total


def build(path: str, n_files: int, rows_per_file: int, chunked: bool) -> None:
    os.makedirs(os.path.join(path, "_manifest"), exist_ok=True)
    files = [
        {
            "path": f"part-{i:06d}.parquet",
            "n_rows": rows_per_file,
            "stats": {
                "k": [i * rows_per_file, (i + 1) * rows_per_file - 1],
                "v": [0.0, 1.0],
            },
        }
        for i in range(n_files)
    ]
    entry = {
        "version": 1,
        "operation": "overwrite",
        "parent": None,
        "n_rows": n_files * rows_per_file,
        "data_dir": "_v1-synthetic",
        "partition_by": None,
        "cdf_dir": None,
        "committed_at": time.time(),
        "modified_keys": None,
        "txn": {},
        "cluster_by": ["k"],
    }
    t = _PlanOnly(path)
    if chunked:
        t._attach_file_stats(entry, files, 1, "synth")
    else:
        entry["files"] = files
    with open(os.path.join(path, "_manifest", "v1.json"), "w") as f:
        json.dump(entry, f)


def main() -> None:
    sizes = [int(x) for x in sys.argv[1:]] or [1_000, 10_000, 100_000]
    rows_per_file = 100_000
    for n in sizes:
        for chunked in (False, True):
            d = tempfile.mkdtemp(prefix="rdl_manifest_bench_")
            try:
                build(d, n, rows_per_file, chunked)
                t = _PlanOnly(d)
                span = n * rows_per_file
                lo, hi = span // 2, span // 2 + span // 1000  # 0.1% range
                best, kept = None, None
                for _ in range(3):
                    t0 = time.perf_counter()
                    k, total = t.plan_range("k", lo, hi)
                    dt = time.perf_counter() - t0
                    best = dt if best is None else min(best, dt)
                    kept = k
                vjson = os.path.getsize(os.path.join(d, "_manifest", "v1.json"))
                print(
                    json.dumps(
                        {
                            "n_files": n,
                            "layout": "chunked" if chunked else "monolithic",
                            "plan_s": round(best, 4),
                            "files_kept": kept,
                            "version_json_bytes": vjson,
                        }
                    )
                )
            finally:
                shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
