"""Capture .explain("formatted") for named queries into plans/<tag>/.

Usage:
    python tools/capture_plans.py --tag r14 --suffix before [name ...]

With no names: the bench HEADLINE + WAVE sets. Each query's physical plan
is written to plans/<tag>/<name>_<suffix>.txt. Queries whose build step
runs side work (streaming fixtures, index builds) execute that work here,
exactly as the bench does, so the captured plan is the plan the bench
times.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from retail_datalakehouse_spark import queries as Q
from retail_datalakehouse_spark.session import build_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="r14")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    names = args.names
    if not names:
        import bench

        names = list(bench.HEADLINE) + list(bench.WAVE)

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", args.tag
    )
    os.makedirs(out_dir, exist_ok=True)

    spark = build_spark("capture-plans")
    registry = Q.all_queries()
    for name in names:
        df = registry[name].fn(spark, args.sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
