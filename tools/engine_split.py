"""Engine-vs-oracle split adjudication for SCALE.md (VERDICT r13 item
6): the sf1 gate-log ratios include DuckDB oracle cost + the checker's
full-result collection; this measures the SPARK SIDE ALONE, warm
session, noop sink (computes every column, transfers nothing), min of
two runs per (query, sf).

Run on an idle host: python tools/engine_split.py q1 q2 ...
Prints one line per query: sf0.1 s, sf1 s, engine-side ratio.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from retail_datalakehouse_spark import queries as Q  # noqa: E402
from retail_datalakehouse_spark.session import build_spark  # noqa: E402

SFS = [("sf0.1", "/root/testdata/sf0.1"), ("sf1", "/root/repo/.sf1")]


def main() -> int:
    names = sys.argv[1:]
    spark = build_spark("engine-split")
    spark.range(1000).count()  # warm the JVM
    reg = Q.all_queries()
    for name in names:
        fn = reg[name].fn
        times = {}
        for label, d in SFS:
            best = None
            for _ in range(2):
                t0 = time.time()
                fn(spark, d).write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            times[label] = best
        r = times["sf1"] / times["sf0.1"] if times["sf0.1"] else float("inf")
        print(f"{name}: sf0.1={times['sf0.1']:.2f}s sf1={times['sf1']:.2f}s "
              f"engine-ratio={r:.1f}x")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
