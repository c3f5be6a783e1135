"""Parallel test lane: run the full pytest suite in < 20 minutes by
running each test MODULE as its own pytest subprocess through a bounded
worker pool (VERDICT r13 item 3 / r12 item 6; no pytest-xdist in the
container, so this is the stdlib equivalent).

Why module granularity: the session-scoped ``spark`` fixture is
per-process anyway, tests within a module may share module-scoped
fixtures/ordering, and no two modules share mutable on-disk state once
each worker gets its own ``spark.sql.warehouse.dir`` (RDL_TEST_WAREHOUSE,
honored by tests/conftest.py). Each subprocess is a plain
``python -m pytest tests/test_x.py`` — the exact same tests, zero
behavioral change, just N JVMs at once. The suite is wall-clock-bound on
streaming micro-batch waits and fixture setup, not CPU, so local[4]
sessions × 8 workers fit 32 cores comfortably.

Scheduling: longest-first by the per-module durations the PREVIOUS run
recorded in tools/test_durations.json (exact, since one process == one
module); first run falls back to file size as the weight proxy. The
floor is the single slowest module — if one module ever exceeds the
budget alone, split that module, not this tool.

Run: python tools/fast_tests.py [-n WORKERS] [extra pytest args...]
Exit 0 iff every module passed. Per-module logs under
/tmp/rdl_fast_tests_<ts>/<module>.log; summary + wall time printed.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DURATIONS = os.path.join(REPO, "tools", "test_durations.json")


def _weights(modules: list[str]) -> dict[str, float]:
    recorded: dict[str, float] = {}
    if os.path.exists(DURATIONS):
        try:
            recorded = json.load(open(DURATIONS))
        except (json.JSONDecodeError, OSError):
            recorded = {}
    return {
        m: float(recorded.get(os.path.basename(m), os.path.getsize(m) / 1000.0))
        for m in modules
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=int(os.environ.get("RDL_TEST_SHARDS", "8")))
    ap.add_argument("rest", nargs="*", help="extra pytest args for every module run")
    args = ap.parse_args()

    modules = sorted(glob.glob(os.path.join(REPO, "tests", "test_*.py")))
    w = _weights(modules)
    queue = sorted(modules, key=lambda m: -w[m])  # longest first
    logdir = tempfile.mkdtemp(prefix="rdl_fast_tests_")
    print(f"{len(modules)} modules, {args.n} workers; logs in {logdir}")

    t0 = time.time()
    running: list[tuple[str, float, object, object]] = []
    done: list[tuple[str, int, float, str]] = []

    def _launch(mod: str) -> None:
        name = os.path.basename(mod)
        env = dict(os.environ)
        env["RDL_TEST_WAREHOUSE"] = os.path.join(logdir, f"wh_{name}")
        # guard against re-entry through the root conftest's whole-suite
        # delegation (the per-module invocation wouldn't match it anyway)
        env["RDL_FAST_TESTS_WORKER"] = "1"
        log = open(os.path.join(logdir, f"{name}.log"), "w")
        p = subprocess.Popen(
            [sys.executable, "-m", "pytest", "-q", "-p", "no:cacheprovider",
             *args.rest, mod],
            cwd=REPO, env=env, stdout=log, stderr=subprocess.STDOUT,
        )
        running.append((mod, time.time(), log, p))

    while queue or running:
        while queue and len(running) < args.n:
            _launch(queue.pop(0))
        time.sleep(0.5)
        for item in list(running):
            mod, started, log, p = item
            if p.poll() is None:
                continue
            running.remove(item)
            log.close()
            took = time.time() - started
            text = open(log.name).read().strip()
            tail = text.splitlines()[-1] if text else "(empty)"
            done.append((mod, p.returncode, took, tail))
            mark = "ok " if p.returncode == 0 else "FAIL"
            print(f"{mark} {os.path.basename(mod)}  {took:6.1f}s  {tail}")

    wall = time.time() - t0
    durations = {os.path.basename(m): round(took, 1) for m, _, took, _ in done}
    json.dump(durations, open(DURATIONS, "w"), indent=1, sort_keys=True)

    totals = {"passed": 0, "failed": 0, "error": 0, "skipped": 0}
    for _, _, _, tail in done:
        for key in totals:
            mm = re.findall(rf"(\d+) {key}", tail)
            if mm:
                totals[key] += int(mm[0])
    failed = [(m, rc) for m, rc, _, _ in done if rc != 0]
    print(f"\nTOTAL {wall:.1f}s wall: {totals['passed']} passed, "
          f"{totals['failed']} failed, {totals['error']} errors, "
          f"{totals['skipped']} skipped")
    if failed:
        for m, rc in failed:
            print(f"FAILED {os.path.basename(m)} rc={rc}: "
                  f"{os.path.join(logdir, os.path.basename(m))}.log")
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
