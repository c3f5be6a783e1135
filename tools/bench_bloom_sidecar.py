"""Point-lookup plan cost vs file count: monolithic vs chunked bloom sidecar.

Builds SYNTHETIC bloom sidecars (no parquet, no Spark — this measures the
pure probe half: sidecar load + chunk resolution + driver bit math) for a
table of N files, then times a 3-value point-lookup probe that zone-survives
a fixed, file-count-independent number of files (the realistic case: zone
maps have already pruned; the bloom refines the survivors).

The monolithic layout re-parses the whole O(N)-sized JSON each plan; the
chunked layout parses an O(N/chunk)-descriptor head plus only the covering
chunk files — plan cost flat in N (the r9 chunked-stats property, applied
to the bloom plane: r9 VERDICT item 3 measured the OLD layout at ~2 GB of
driver JSON for 10^6 files).

Usage: python tools/bench_bloom_sidecar.py [N ...]   (default 1k 10k 100k)
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

from retail_datalakehouse_spark.operators.bloom import bloom_test  # noqa: E402
from retail_datalakehouse_spark.sources import table_format as tf  # noqa: E402

M_BITS = 4096
K = 7
CHUNK = 1000


class _ProbeOnly(tf.VersionedTable):
    """read_pruned_in's bloom half, minus Spark: sidecar resolution and
    word lookup are exactly the code under test."""

    def __init__(self, path: str):
        self.spark = None
        self.path = path
        self._manifest_dir = os.path.join(path, "_manifest")
        self._record_cdf = False
        self._cdf_keys = []
        self._ref_name = None

    def probe(self, keys: list[str], hashes: list[int]) -> int:
        head = self._bloom_sidecar(1)  # cold: parse per plan, like read_pruned_in
        per_file = self._bloom_words_for(head, "k", keys)
        return sum(
            1
            for p in keys
            if (w := per_file.get(p)) is not None
            and any(bloom_test(w, h, head["m_bits"], head["k"]) for h in hashes)
        )


def _words_for(i: int) -> list[int]:
    # deterministic pseudo-random word array per file (content does not
    # matter for plan cost; only its size does)
    return [(i * 2654435761 + w * 40503) & ((1 << 64) - 1) for w in range(M_BITS // 64)]


def _key(i: int) -> str:
    return f"_v1-synthetic/part-{i:06d}.parquet"


def build(path: str, n_files: int, chunked: bool) -> None:
    mdir = os.path.join(path, "_manifest")
    os.makedirs(mdir, exist_ok=True)
    head: dict = {"version": 1, "m_bits": M_BITS, "k": K, "dtypes": {"k": "bigint"}}
    keys = [_key(i) for i in range(n_files)]
    if not chunked:
        head["cols"] = {"k": {kk: _words_for(i) for i, kk in enumerate(keys)}}
    else:
        descs = []
        for ci, lo in enumerate(range(0, n_files, CHUNK)):
            sl = keys[lo : lo + CHUNK]
            p = f"bloom-v1.c0.{ci}.json"
            with open(os.path.join(mdir, p), "w") as f:
                json.dump({kk: _words_for(lo + j) for j, kk in enumerate(sl)}, f)
            descs.append({"path": p, "lo": sl[0], "hi": sl[-1], "n": len(sl)})
        head["chunks"] = {"k": descs}
    with open(os.path.join(mdir, "bloom-v1.json"), "w") as f:
        json.dump(head, f)


def main() -> None:
    sizes = [int(x) for x in sys.argv[1:]] or [1_000, 10_000, 100_000]
    for n in sizes:
        for chunked in (False, True):
            d = tempfile.mkdtemp(prefix="rdl_bloom_bench_")
            try:
                build(d, n, chunked)
                t = _ProbeOnly(d)
                # zone maps already pruned to a fixed survivor set — the
                # realistic probe shape at any table size
                keys = [_key(i) for i in (0, n // 2, n - 1)]
                hashes = [123456789, -987654321, 42]
                best = None
                for _ in range(3):
                    t0 = time.perf_counter()
                    t.probe(keys, hashes)
                    dt = time.perf_counter() - t0
                    best = dt if best is None else min(best, dt)
                side = sum(
                    os.path.getsize(os.path.join(d, "_manifest", f))
                    for f in os.listdir(os.path.join(d, "_manifest"))
                )
                head_b = os.path.getsize(os.path.join(d, "_manifest", "bloom-v1.json"))
                print(
                    json.dumps(
                        {
                            "n_files": n,
                            "layout": "chunked" if chunked else "monolithic",
                            "probe_s": round(best, 5),
                            "head_bytes": head_b,
                            "sidecar_bytes_total": side,
                        }
                    )
                )
            finally:
                shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
