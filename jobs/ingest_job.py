"""`ray job submit`-able entrypoint: the resumable flagship ingest.

On a real cluster:

    ray job submit --working-dir . -- \
        python jobs/ingest_job.py --sf-dir <data> --out /mnt/out/tiles \
        --num-shards 64

In this sandbox Ray is local-only; the script guards its own
``ray.init`` (the grading driver owns the session when it imports
``__ray_entry__`` instead).  The run is RESUMABLE: each key-range shard
writes partitioned Parquet plus a lineage manifest
(engine/rayds/ckpt.py); re-submitting after a failure recomputes only
shards whose manifest is missing or whose input fingerprint changed.
Exit output is ONE JSON line of per-shard metrics — the "per-partition
lineage + metrics" contract.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--out", default="/tmp/ingest_out")
    ap.add_argument("--num-shards", type=int, default=8)
    ap.add_argument("--pipeline",
                    choices=["tiles", "celljoin", "dedup", "wds", "curation",
                             "curation_full", "keyedjoin_s2", "keyedjoin_hex"],
                    default="tiles")
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")

    from engine.rayds import ckpt, pipeline

    t0 = time.perf_counter()
    if args.pipeline == "tiles":
        res = pipeline.run_tiles_checkpointed_ranges(
            args.sf_dir, args.out, num_shards=args.num_shards)
    elif args.pipeline == "celljoin":
        res = pipeline.run_celljoin_checkpointed(
            args.sf_dir, args.out, num_shards=args.num_shards)
    elif args.pipeline == "wds":
        from engine.rayds.wds import run_wds_checkpointed

        res = run_wds_checkpointed(
            args.sf_dir, args.out, num_shards=args.num_shards)
    elif args.pipeline == "curation":
        res = pipeline.run_curation_checkpointed(
            args.sf_dir, args.out, num_shards=args.num_shards)
    elif args.pipeline == "curation_full":
        full = pipeline.run_curation_full(
            args.sf_dir, args.out, num_shards=args.num_shards)
        print(json.dumps({
            "pipeline": "curation_full",
            "wall_secs": round(time.perf_counter() - t0, 3),
            **{k: v for k, v in full.items() if k.startswith("rows")},
            "phase1": full["phase1"], "phase2": full["phase2"],
            "phase3": full["phase3"],
        }))
        return 0
    elif args.pipeline in ("keyedjoin_s2", "keyedjoin_hex"):
        res = pipeline.run_keyedjoin_checkpointed(
            args.sf_dir, args.out, num_shards=args.num_shards,
            plan=args.pipeline.split("_")[1])
    else:
        res = pipeline.run_dedup_checkpointed(
            args.sf_dir, args.out, num_shards=args.num_shards)
    wall = time.perf_counter() - t0

    shards = []
    for i in sorted(res["computed"]) + sorted(res["skipped"]):
        mp = ckpt.manifest_path(args.out, i)
        with open(mp) as f:
            m = json.load(f)
        shards.append({"shard": i, "rows": m["rows"],
                       "wall_secs": round(m["wall_secs"], 3),
                       "status": "computed" if i in res["computed"] else "skipped"})
    print(json.dumps({
        "pipeline": args.pipeline,
        "sf_dir": args.sf_dir,
        "out": args.out,
        "computed": res["computed"],
        "skipped": res["skipped"],
        "total_rows": sum(s["rows"] for s in shards),
        "wall_secs": round(wall, 3),
        "shards": shards,
    }))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
