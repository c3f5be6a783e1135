"""Root conftest: route WHOLE-SUITE pytest runs through the parallel
module lane (tools/fast_tests.py) so the default ``python -m pytest
tests/ -x -q`` finishes inside a CI window (VERDICT r14 item 2: the serial
suite is wall-clock-bound on streaming micro-batch waits and takes 15-50+
minutes depending on host; the module-sharded lane runs the exact same
tests in ~12 minutes).

Scope guard: only a plain invocation of the full ``tests/`` directory (or
the repo root) is delegated. Anything narrower — a single file, ``-k``,
``-m``, ``--collect-only`` — runs inline exactly as before, as do the
per-module subprocesses the lane itself spawns (RDL_FAST_TESTS_WORKER) and
any run with RDL_SERIAL_TESTS=1 set.
"""

from __future__ import annotations

import os
import subprocess
import sys

_ROOT = os.path.dirname(os.path.abspath(__file__))


def _is_whole_suite(config) -> bool:
    if os.environ.get("RDL_SERIAL_TESTS") or os.environ.get("RDL_FAST_TESTS_WORKER"):
        return False
    try:
        if config.getoption("keyword") or config.getoption("markexpr"):
            return False
        if config.getoption("collectonly"):
            return False
    except ValueError:
        return False
    tests_dir = os.path.join(_ROOT, "tests")
    targets = [
        os.path.normpath(os.path.abspath(a.split("::")[0])) for a in config.args
    ]
    return bool(targets) and all(t in (tests_dir, _ROOT) for t in targets)


def pytest_cmdline_main(config):
    if not _is_whole_suite(config):
        return None
    passthrough = []
    try:
        if config.getoption("exitfirst"):
            passthrough.append("-x")
    except ValueError:
        pass
    sys.stderr.write(
        "[conftest] whole-suite run -> parallel module lane "
        "(tools/fast_tests.py; RDL_SERIAL_TESTS=1 for the serial lane)\n"
    )
    sys.stderr.flush()
    return subprocess.call(
        [sys.executable, os.path.join(_ROOT, "tools", "fast_tests.py"), *passthrough],
        cwd=_ROOT,
    )
