"""CLI smoke for jobs/ingest_job.py — the `ray job submit` entry the
north rule names.  Each pipeline runs in ITS OWN subprocess (the job
owns its Ray session, per the driver contract) against sf0.001 and
must emit one valid JSON line with per-shard lineage."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parametrize("pipe", ["tiles", "celljoin", "dedup",
                                  "curation", "wds"])
def test_ingest_job_cli(tmp_path, pipe):
    out = str(tmp_path / f"job_{pipe}")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "ingest_job.py"),
         "--pipeline", pipe, "--sf-dir", "/root/testdata/sf0.001",
         "--out", out, "--num-shards", "3", "--num-cpus", "4"],
        capture_output=True, text=True, timeout=420, cwd=REPO)
    assert r.returncode == 0, r.stderr[-2000:]
    line = r.stdout.strip().splitlines()[-1]
    m = json.loads(line)
    assert m["pipeline"] == pipe
    assert m["computed"] == [0, 1, 2]
    assert m["total_rows"] > 0
    assert len(m["shards"]) == 3
    for s in m["shards"]:
        assert s["status"] == "computed" and s["rows"] >= 0
    # manifests exist on disk (the resume contract's substrate)
    manifests = [f for f in os.listdir(out)
                 if f.startswith("_manifest")] or \
        [f for f in os.listdir(out) if "manifest" in f]
    assert manifests or any(
        os.path.isdir(os.path.join(out, d)) for d in os.listdir(out))
