"""Per-partition checkpoint manifests + resumable runs (north_rule).

Output layout: one directory per input shard (``shard=<i>/``) of
partitioned Parquet plus ``_manifest/shard-<i>.json`` recording lineage
(input files + byte sizes + mtime fingerprint), row counts and wall
time.  A restarted run recomputes ONLY shards whose manifest is missing
or whose input fingerprint changed — at 100 TB a shard is a file group,
here it's a contiguous slice of the input fragments.
"""

from __future__ import annotations

import hashlib
import json
import os
import time


def shard_fingerprint(paths: list[str]) -> str:
    h = hashlib.sha256()
    for p in sorted(paths):
        st = os.stat(p)
        h.update(f"{p}:{st.st_size}:{int(st.st_mtime)}".encode())
    return h.hexdigest()[:16]


def manifest_path(out_dir: str, shard: int) -> str:
    return os.path.join(out_dir, "_manifest", f"shard-{shard}.json")


def shard_done(out_dir: str, shard: int, fingerprint: str) -> bool:
    mp = manifest_path(out_dir, shard)
    if not os.path.exists(mp):
        return False
    try:
        with open(mp) as f:
            m = json.load(f)
        return m.get("fingerprint") == fingerprint and m.get("status") == "complete"
    except (json.JSONDecodeError, OSError):
        return False


def write_manifest(out_dir: str, shard: int, fingerprint: str, rows: int,
                   secs: float, extra: dict | None = None) -> None:
    os.makedirs(os.path.join(out_dir, "_manifest"), exist_ok=True)
    m = {
        "shard": shard,
        "fingerprint": fingerprint,
        "rows": rows,
        "wall_secs": secs,
        "status": "complete",
        "written_at": time.time(),
    }
    if extra:
        m.update(extra)
    tmp = manifest_path(out_dir, shard) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(m, f)
    os.replace(tmp, manifest_path(out_dir, shard))  # atomic publish


def run_sharded(build_shard_ds, input_paths: list[str], out_dir: str,
                num_shards: int = 4) -> dict:
    """Resumable driver loop: per missing shard, build its Dataset and
    write ``out_dir/shard=<i>/``.

    ``build_shard_ds(paths) -> Dataset`` constructs the (lazy) pipeline
    for one shard's input files; each shard run streams through Ray's
    executor with full parallelism, so the outer loop costs only
    scheduling.  Returns {"computed": [...], "skipped": [...]}.
    """
    shards = [list(input_paths[i::num_shards]) for i in range(num_shards)]
    shards = [s for s in shards if s]
    computed, skipped = [], []
    for i, paths in enumerate(shards):
        fp = shard_fingerprint(paths)
        if shard_done(out_dir, i, fp):
            skipped.append(i)
            continue
        t0 = time.perf_counter()
        ds = build_shard_ds(paths)
        dest = os.path.join(out_dir, f"shard={i}")
        _fresh_dir(dest)  # idempotent per-shard output: replace, never append
        ds.write_parquet(dest)
        rows = sum(
            _parquet_rows(os.path.join(dest, f))
            for f in os.listdir(dest)
            if f.endswith(".parquet")
        )
        write_manifest(out_dir, i, fp, rows, time.perf_counter() - t0,
                       extra={"inputs": paths})
        computed.append(i)
    return {"computed": computed, "skipped": skipped}


def _fresh_dir(dest: str) -> None:
    import shutil

    shutil.rmtree(dest, ignore_errors=True)
    os.makedirs(dest, exist_ok=True)


def _parquet_rows(path: str) -> int:
    import pyarrow.parquet as pq

    return pq.ParquetFile(path).metadata.num_rows


def run_sharded_ranges(build_shard_ds, fingerprint_paths: list[str],
                       out_dir: str, num_shards: int) -> dict:
    """Resumable run with KEY-RANGE shards (single-file inputs).

    ``build_shard_ds(shard_idx, num_shards) -> Dataset`` builds the
    pipeline for one deterministic key-range slice (e.g. rows with
    ``key % num_shards == shard_idx``).  Manifest fingerprint = input
    files + the (shard, num_shards) slice — at 100 TB scale shards are
    file groups and `run_sharded` applies instead."""
    base_fp = shard_fingerprint(fingerprint_paths)
    computed, skipped = [], []
    for i in range(num_shards):
        fp = f"{base_fp}:{i}/{num_shards}"
        if shard_done(out_dir, i, fp):
            skipped.append(i)
            continue
        t0 = time.perf_counter()
        ds = build_shard_ds(i, num_shards)
        dest = os.path.join(out_dir, f"shard={i}")
        _fresh_dir(dest)  # idempotent per-shard output: replace, never append
        ds.write_parquet(dest)
        rows = sum(
            _parquet_rows(os.path.join(dest, f))
            for f in os.listdir(dest)
            if f.endswith(".parquet")
        )
        write_manifest(out_dir, i, fp, rows, time.perf_counter() - t0,
                       extra={"inputs": fingerprint_paths, "slice": [i, num_shards]})
        computed.append(i)
    return {"computed": computed, "skipped": skipped}


def write_hash_partitioned(ds, out_dir: str, key_cols: list[str],
                           num_parts: int = 64) -> dict:
    """CLUSTERED sink: hive-partitioned Parquet on ``part =
    hash(key_cols) % num_parts`` — the engine's own shuffle hash, so a
    table written once with this sink is PRE-CO-LOCATED for every later
    equi-join / groupby on the same key (read one ``part=<p>/``
    directory per reducer, no exchange; the "pick ONE partitioning key
    and reuse it" principle materialized).  Returns {"parts": n,
    "rows": total} and writes a ``_manifest/partitioning.json`` naming
    the key and hash so readers can verify compatibility."""
    import pyarrow as pa

    from engine.rayds.shuffle import add_hash_part

    keyed = ds.map_batches(
        add_hash_part(key_cols, num_parts), batch_format="pyarrow",
        batch_size=None, zero_copy_batch=True,
    ).map_batches(
        lambda b: b.rename_columns(
            [c if c != "_part" else "part" for c in b.column_names]
        ),
        batch_format="pyarrow", batch_size=None,
    )
    keyed.write_parquet(out_dir, partition_cols=["part"])
    total = 0
    parts = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not name.startswith("part=") or not os.path.isdir(d):
            continue
        parts += 1
        total += sum(
            _parquet_rows(os.path.join(d, f))
            for f in os.listdir(d) if f.endswith(".parquet")
        )
    os.makedirs(os.path.join(out_dir, "_manifest"), exist_ok=True)
    meta = {"key_cols": key_cols, "num_parts": num_parts,
            "hash": "engine.rayds.shuffle._col_hash", "rows": total,
            "written_at": time.time()}
    with open(os.path.join(out_dir, "_manifest", "partitioning.json"), "w") as f:
        json.dump(meta, f)
    return {"parts": parts, "rows": total}
