"""Compare two BENCH_*.json artifacts per query.

Usage: python tools/bench_diff.py OLD.json NEW.json [--top N]

Prints one line per query present in either file — old secs, new secs,
ratio — sorted by absolute regression first, plus headline/rows-per-sec
deltas and the memory state of each run (a DEGRADED window explains a
global slowdown better than any code change)."""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    with open(path) as f:
        return json.loads(f.read().strip().splitlines()[-1])


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    top = 0
    if "--top" in sys.argv:
        top = int(sys.argv[sys.argv.index("--top") + 1])
    old, new = load(args[0]), load(args[1])
    oq, nq = old.get("queries", {}), new.get("queries", {})
    names = sorted(set(oq) | set(nq))
    rows = []
    for n in names:
        a, b = oq.get(n), nq.get(n)
        if a is None or b is None:
            rows.append((float("inf"), n, a, b, None))
            continue
        rows.append((b - a, n, a, b, b / a if a else float("inf")))
    rows.sort(key=lambda r: -(r[0] if r[0] != float("inf") else 1e9))
    shown = rows[:top] if top else rows
    for delta, n, a, b, ratio in shown:
        if a is None:
            print(f"{n:28s}  NEW          {b:7.2f}s")
        elif b is None:
            print(f"{n:28s}  REMOVED {a:7.2f}s")
        else:
            print(f"{n:28s} {a:7.2f}s -> {b:7.2f}s  x{ratio:5.2f}")
    for k in ("value", "rows_per_sec"):
        if k in old or k in new:
            print(f"{k}: {old.get(k)} -> {new.get(k)}")
    for tag, d in (("old", old), ("new", new)):
        mem = d.get("mem_bandwidth")
        if isinstance(mem, dict):
            print(f"{tag} mem state: {mem.get('state')}")
    tot_o = sum(v for v in oq.values())
    tot_n = sum(v for v in nq.values())
    print(f"battery total: {tot_o:.1f}s ({len(oq)} q) -> "
          f"{tot_n:.1f}s ({len(nq)} q)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
