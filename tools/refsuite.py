"""Run the reference's OWN test suite against this engine's facade.

Copies /root/reference/shapely/tests into a scratch dir next to a
generated ``shapely`` alias package that re-exports ``engine.compat``,
then runs pytest per file and prints a JSON scorecard.  Nothing from the
reference is committed to this repo — the copy lives under /tmp for the
duration of the run.

Usage:
    python tools/refsuite.py                  # every test file
    python tools/refsuite.py test_predicates  # one file (substring match)
    python tools/refsuite.py --list           # show per-file results only
"""

from __future__ import annotations

import json
import os
import re
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_TESTS = "/root/reference/shapely/tests"
SCRATCH = "/tmp/refsuite"

SHIM = '''\
import sys
sys.path.insert(0, {repo!r})
from engine.compat import *  # noqa: F401,F403
import engine.compat as _c
for _name in ("wkt", "wkb", "ops", "prepared", "testing", "errors",
              "geometry", "plotting", "speedups", "coords", "strtree",
              "validation", "measurement", "linear", "io", "coverage",
              "geos", "decorators", "affinity", "coordinates", "creation",
              "constructive", "predicates", "set_operations", "vectorized",
              "algorithms", "lib"):
    _m = getattr(_c, _name, None)
    if _m is not None:
        sys.modules[f"shapely.{{_name}}"] = _m
import types as _types
for _parent in ("geometry", "algorithms"):
    _pm = getattr(_c, _parent, None)
    if _pm is None:
        continue
    for _name in dir(_pm):
        _m = getattr(_pm, _name)
        if isinstance(_m, _types.ModuleType) and not _name.startswith("__"):
            sys.modules[f"shapely.{{_parent}}.{{_name}}"] = _m
__version__ = getattr(_c, "__version__", "2.1.0")
geos_version = _c.geos_version
geos_version_string = _c.geos_version_string
'''


CONFTEST = '''\
import signal

import pytest


@pytest.fixture(autouse=True)
def _per_test_alarm():
    """Bound every reference test at 90 s — a hang is a FAIL, not a stall.

    90 s (not 20) because this sandbox VM intermittently degrades to a
    few percent of normal DRAM bandwidth (tools/memprobe.py); the bound
    exists to catch genuine hangs, not to benchmark."""

    def handler(signum, frame):
        raise TimeoutError("per-test timeout (refsuite)")

    old = signal.signal(signal.SIGALRM, handler)
    signal.alarm(90)
    yield
    signal.alarm(0)
    signal.signal(signal.SIGALRM, old)
'''


def setup() -> None:
    shutil.rmtree(SCRATCH, ignore_errors=True)
    os.makedirs(os.path.join(SCRATCH, "shapely"))
    shutil.copytree(REF_TESTS, os.path.join(SCRATCH, "shapely", "tests"))
    with open(os.path.join(SCRATCH, "shapely", "__init__.py"), "w") as f:
        f.write(SHIM.format(repo=REPO))
    with open(os.path.join(SCRATCH, "conftest.py"), "w") as f:
        f.write(CONFTEST)


def run_file(rel: str, timeout: int = 900) -> dict:
    try:
        proc = subprocess.run(
            [sys.executable, "-m", "pytest", f"shapely/tests/{rel}",
             "-q", "-p", "no:cacheprovider", "--no-header",
             "--continue-on-collection-errors"],
            cwd=SCRATCH, capture_output=True, text=True, timeout=timeout,
            env={**os.environ,
                 "PYTHONPATH": SCRATCH + os.pathsep
                 + os.environ.get("PYTHONPATH", "")},
        )
    except subprocess.TimeoutExpired:
        return {"file": rel, "passed": 0, "failed": 0, "skipped": 0,
                "errors": 1, "summary": f"FILE TIMEOUT > {timeout}s"}
    tail = (proc.stdout or "").strip().splitlines()
    summary = tail[-1] if tail else ""
    counts = dict.fromkeys(("passed", "failed", "skipped", "errors", "error"), 0)
    for n, kind in re.findall(r"(\d+) (passed|failed|skipped|errors?)", summary):
        counts[kind] += int(n)
    return {
        "file": rel,
        "passed": counts["passed"],
        "failed": counts["failed"],
        "skipped": counts["skipped"],
        "errors": counts["errors"] + counts["error"],
        "summary": summary[:160],
    }


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    setup()
    files = sorted(
        os.path.relpath(os.path.join(root, f), REF_TESTS)
        for root, _dirs, names in os.walk(REF_TESTS)
        for f in names
        if f.startswith("test_") and f.endswith(".py")
    )
    if args:
        files = [f for f in files if any(a in f for a in args)]
    results = [run_file(f) for f in files]
    total_p = sum(r["passed"] for r in results)
    total_f = sum(r["failed"] for r in results)
    total_e = sum(r["errors"] for r in results)
    for r in results:
        status = "OK " if r["failed"] == 0 and r["errors"] == 0 else "FAIL"
        print(f"{status} {r['file']:36s} {r['passed']:5d} passed "
              f"{r['failed']:4d} failed {r['errors']:3d} errors")
    print(json.dumps({
        "metric": "reference-suite parity",
        "passed": total_p, "failed": total_f, "errors": total_e,
        "pass_rate": round(total_p / max(1, total_p + total_f), 4),
        "files": {r["file"]: [r["passed"], r["failed"], r["errors"]]
                  for r in results},
    }))


if __name__ == "__main__":
    main()
