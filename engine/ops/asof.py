"""AS-OF join — a custom temporal operator Ray Data lacks (task brief:
"when the reference has an operator Ray Data lacks … implement it as a
composition of map_batches + groupby().map_groups").

For every LEFT-stream event, find the latest RIGHT-stream event of the
same key with ts ≤ left.ts.  Physical plan: filter both streams in one
map pass, hash-partition by key, and resolve each partition with one
vectorized sorted sweep (sort by (key, ts, side) then a segment-aware
running maximum of right-row indices — no per-row Python).

Partitioning assumption (documented per the brief): all rows of one key
land in one partition — the standard as-of co-partitioning; skewed keys
would need time-range sub-splits with boundary handoff.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

ASOF_PARTS = 32


def _asof_group(group: pa.Table) -> pa.Table:
    """One hash partition: vectorized as-of resolution.

    Sort by (key, ts, side) with RIGHT rows first at equal ts (ts ≤
    semantics); a running maximum over ``key·N + row`` of right rows
    yields, for every left row, the latest preceding right row — the
    encoded key makes the maximum self-invalidating across key changes.
    """
    n = len(group)
    key = group["user_id"].to_numpy()
    ts = group["ts_us"].to_numpy()
    eid = group["event_id"].to_numpy()
    is_left = group["is_left"].to_numpy()
    order = np.lexsort((is_left, ts, key))
    k, t, e, L = key[order], ts[order], eid[order], is_left[order]
    idx = np.arange(n, dtype=np.int64)
    enc = np.where(~L.astype(bool), k * np.int64(n + 1) + idx, np.int64(-1))
    run = np.maximum.accumulate(enc)
    lefts = np.nonzero(L)[0]
    have = run[lefts] >= 0
    run_l = run[lefts][have]
    match_pos = run_l % np.int64(n + 1)
    match_key = run_l // np.int64(n + 1)
    same_key = match_key == k[lefts][have]
    out_left = e[lefts][have][same_key]
    out_match = e[match_pos[same_key]]
    return pa.table(
        {
            "event_id": pa.array(out_left),
            "match_id": pa.array(out_match),
        }
    )


def asof_join(events_ds, left_type: str, right_type: str,
              num_parts: int = ASOF_PARTS):
    """Dataset pipeline: latest right_type event per key at-or-before
    each left_type event (inner: unmatched left rows drop)."""

    def prep(batch: pa.Table) -> pa.Table:
        et = batch["event_type"]
        keep = pc.or_(pc.equal(et, left_type), pc.equal(et, right_type))
        t = batch.filter(keep)
        uid = t["user_id"].to_numpy()
        return pa.table(
            {
                "_part": pa.array((uid % num_parts).astype(np.int64)),
                "user_id": t["user_id"],
                "ts_us": t["ts"].cast(pa.int64()),
                "event_id": t["event_id"],
                "is_left": pc.equal(t["event_type"], left_type),
            }
        )

    tagged = events_ds.map_batches(
        prep, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
    return tagged.groupby("_part").map_groups(_asof_group, batch_format="pyarrow")
