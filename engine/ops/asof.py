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


def _asof_sweep(key, ts, eid, is_left):
    """Vectorized as-of resolution over one co-located partition.

    Sort by (key, ts, side) with RIGHT rows first at equal ts (ts ≤
    semantics); a running maximum over ``key_rank·N + row`` of right
    rows yields, for every left row, the latest preceding right row —
    the encoded key makes the maximum self-invalidating across key
    changes.  Keys are RANK-encoded first (rank < n), so the encoding
    never overflows int64 regardless of raw key magnitude.

    Returns ``(left_eids, match_eids, unmatched_left_eids)``.
    """
    n = len(key)
    order = np.lexsort((is_left, ts, key))
    k, t, e, L = key[order], ts[order], eid[order], is_left[order]
    # rank-encode keys (already sorted by key first)
    new_k = np.ones(n, dtype=bool)
    new_k[1:] = k[1:] != k[:-1]
    kr = np.cumsum(new_k) - 1
    idx = np.arange(n, dtype=np.int64)
    enc = np.where(~L.astype(bool), kr * np.int64(n + 1) + idx, np.int64(-1))
    run = np.maximum.accumulate(enc)
    lefts = np.nonzero(L)[0]
    have = run[lefts] >= 0
    run_l = run[lefts][have]
    match_pos = run_l % np.int64(n + 1)
    match_key = run_l // np.int64(n + 1)
    same_key = match_key == kr[lefts][have]
    out_left = e[lefts][have][same_key]
    out_match = e[match_pos[same_key]]
    matched_mask = np.zeros(len(lefts), dtype=bool)
    hv = np.nonzero(have)[0]
    matched_mask[hv[same_key]] = True
    unmatched = e[lefts][~matched_mask]
    return out_left, out_match, unmatched


def _asof_group(group: pa.Table) -> pa.Table:
    """One hash partition (whole keys co-located): inner as-of."""
    out_left, out_match, _ = _asof_sweep(
        group["user_id"].to_numpy(),
        group["ts_us"].to_numpy(),
        group["event_id"].to_numpy(),
        group["is_left"].to_numpy(),
    )
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
        return pa.table(
            {
                "user_id": t["user_id"],
                "ts_us": t["ts"].cast(pa.int64()),
                "event_id": t["event_id"],
                "is_left": pc.equal(t["event_type"], left_type),
            }
        )

    from engine.rayds.shuffle import hash_exchange_groups

    tagged = events_ds.map_batches(
        prep, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
    return hash_exchange_groups(tagged, ["user_id"], _asof_group, num_parts)


def asof_join_split(events_ds, left_type: str, right_type: str,
                    bucket_us: int, num_parts: int = ASOF_PARTS):
    """Skew-proof AS-OF join: time-range pre-split + broadcast carry.

    ``asof_join`` co-locates ALL events of one key in one partition; a
    hot key breaks that budget.  Here both streams partition by
    ``(key, ts // bucket_us)`` so a hot key spreads across its time
    range.  A left event whose latest preceding right lives in an
    EARLIER bucket can't be resolved locally, so:

    1. Carry table (distributed partial + tiny driver fold): per
       (key, bucket) the latest right event — one row per non-empty
       (key, bucket), bounded by keys × time-buckets, never by event
       volume.  Among equal max-ts rights the largest event_id wins
       (deterministic; matched by the equivalence test's tie-free data).
    2. Phase B: per (key, bucket) partition, the same vectorized sweep
       as ``_asof_group`` resolves lefts with an in-bucket predecessor;
       the rest look up the carry of the GREATEST bucket' < b for their
       key (vectorized searchsorted over the broadcast, cumulative-safe:
       any right in an earlier bucket has ts < bucket start ≤ left.ts).

    The carry rides once per worker via ``bcast.cached`` (ray.put on the
    driver) — no second skewed exchange exists anywhere in the plan.
    """
    import ray

    from engine.rayds.bcast import cached

    def prep(batch: pa.Table) -> pa.Table:
        et = batch["event_type"]
        keep = pc.or_(pc.equal(et, left_type), pc.equal(et, right_type))
        t = batch.filter(keep)
        ts = t["ts"].cast(pa.int64()).to_numpy()
        bkt = ts // np.int64(bucket_us)
        return pa.table(
            {
                "_bkt": pa.array(bkt),
                "user_id": t["user_id"],
                "ts_us": pa.array(ts),
                "event_id": t["event_id"],
                "is_left": pc.equal(t["event_type"], left_type),
            }
        )

    # materialized ONCE: both the carry pass below and the final groupby
    # consume it — un-materialized, the prep scan would execute twice
    tagged = events_ds.map_batches(
        prep, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).materialize()

    # ---- carry table: latest right per (key, bucket) ----------------
    def right_max(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.invert(batch["is_left"]))
        if len(t) == 0:
            return pa.table({"user_id": pa.array([], type=batch["user_id"].type),
                             "_bkt": pa.array([], type=pa.int64()),
                             "ts_us": pa.array([], type=pa.int64()),
                             "event_id": pa.array([], type=batch["event_id"].type)})
        uid = t["user_id"].to_numpy()
        bkt = t["_bkt"].to_numpy()
        ts = t["ts_us"].to_numpy()
        eid = t["event_id"].to_numpy()
        order = np.lexsort((eid, ts, bkt, uid))
        uid, bkt, ts, eid = uid[order], bkt[order], ts[order], eid[order]
        last = np.ones(len(uid), dtype=bool)
        last[:-1] = (uid[1:] != uid[:-1]) | (bkt[1:] != bkt[:-1])
        return pa.table({"user_id": uid[last], "_bkt": bkt[last],
                         "ts_us": ts[last], "event_id": eid[last]})

    # 16-way tree fold first: the per-block partials are distinct
    # (key, bucket) rows — a flat driver collect would scale with
    # blocks × carriers, the exact bottleneck the other driver folds
    # avoid the same way
    def right_max_merge(batch: pa.Table) -> pa.Table:
        # partials carry no is_left column — everything is a right
        return right_max(batch.append_column(
            "is_left", pa.array(np.zeros(len(batch), dtype=bool))))

    from engine.rayds.shuffle import tree_fold_refs

    parts = tree_fold_refs(
        tagged.map_batches(right_max, batch_format="pyarrow",
                           batch_size=None),
        lambda tbls: right_max_merge(pa.concat_tables(tbls)
                                     .combine_chunks()))
    cu = parts["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    cb = parts["_bkt"].to_numpy(zero_copy_only=False).astype(np.int64)
    ct = parts["ts_us"].to_numpy(zero_copy_only=False).astype(np.int64)
    ce = parts["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((ce, ct, cb, cu))
    cu, cb, ct, ce = cu[order], cb[order], ct[order], ce[order]
    last = np.ones(len(cu), dtype=bool)
    last[:-1] = (cu[1:] != cu[:-1]) | (cb[1:] != cb[:-1])
    cu, cb, ce = cu[last], cb[last], ce[last]
    bmin = int(cb.min()) if len(cb) else 0
    span = (int(cb.max()) - bmin + 2) if len(cb) else 1
    # RANK-encoded keys (not raw ids × span): snowflake-scale ids times
    # a wide bucket span would overflow int64 and silently unsort the
    # searchsorted lookup; ranks are bounded by the carrier count
    cuniq = np.unique(cu)
    urank = np.searchsorted(cuniq, cu)
    carry_enc = urank * np.int64(span) + (cb - bmin)
    carry_ref = ray.put((carry_enc, ce, np.int64(span), np.int64(bmin), cuniq))

    def group_fn(group: pa.Table) -> pa.Table:
        enc, eids, span_, bmin_, cuniq_ = cached(carry_ref)
        uid = group["user_id"].to_numpy()
        bkt = group["_bkt"].to_numpy()
        # sweep segmented by (key, bucket) — a co-resident EARLIER bucket
        # of the same key must NOT shadow the carry (its latest right may
        # be older than another bucket's, which lives elsewhere).
        # GROUP-LOCAL RANK ENCODING: the carry table's span is derived
        # from the RIGHTS' bucket range, so a left bucket beyond it would
        # alias another key's segment — rank both components within the
        # group instead (injective, lex-order-preserving, overflow-free).
        uu, uinv = np.unique(uid, return_inverse=True)
        ub, binv = np.unique(bkt, return_inverse=True)
        seg = uinv.astype(np.int64) * np.int64(len(ub)) + binv.astype(np.int64)
        out_l, out_m, unmatched = _asof_sweep(
            seg, group["ts_us"].to_numpy(), group["event_id"].to_numpy(),
            group["is_left"].to_numpy(),
        )
        base = pa.table({"event_id": pa.array(out_l),
                         "match_id": pa.array(out_m)})
        if len(unmatched) == 0:
            return base
        # carry lookup: greatest bucket' < b with a right for this key
        lmask = group["is_left"].to_numpy()
        lids = group["event_id"].to_numpy()[lmask]
        un_sel = np.isin(lids, unmatched)
        uq = uid[lmask][un_sel]
        bq = bkt[lmask][un_sel]
        # rank the queried keys into the carry table's key universe
        # (a key with no carries at all maps out of range → unmatched)
        ur = np.searchsorted(cuniq_, uq)
        present = ur < len(cuniq_)
        present[present] &= cuniq_[ur[present]] == uq[present]
        # clamp the bucket offset into the carry encoding's range: a left
        # bucket PAST the rights' max bucket must query the key's LAST
        # carry (offset span-1 — strictly above every real carry offset,
        # still inside this key's block), and one BEFORE the min bucket
        # can match nothing (offset 0 finds no carry < it for this key)
        q = ur * span_ + np.clip(bq - bmin_, 0, span_ - 1)
        pos = np.searchsorted(enc, q, side="left") - 1
        ok = present & (pos >= 0)
        ok[ok] &= (enc[pos[ok]] // span_) == ur[ok]
        extra = pa.table({"event_id": pa.array(lids[un_sel][ok]),
                          "match_id": pa.array(eids[pos[ok]])})
        return pa.concat_tables([base, extra])

    from engine.rayds.shuffle import hash_exchange_groups

    return hash_exchange_groups(tagged, ["user_id", "_bkt"], group_fn,
                                num_parts)
