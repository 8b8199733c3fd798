"""Interval overlap join — the 1-D time-range join family.

``interval_join(left, right, ...)`` pairs every left interval [l0, l1]
with every right interval [r0, r1] that overlaps it (closed ends:
``l0 <= r1 AND r0 <= l1``) — sessions × maintenance windows, ad
impressions × outages, etc.  The bbox range join (celljoin.boxpart_pairs)
is its 2-D sibling; this one co-partitions on TIME BUCKETS:

- both sides explode to the bucket range their interval spans
  (len/bucket_us + 1 replicas — bounded, choose bucket_us ≳ typical
  interval length so the blow-up is ≤ 2×);
- ONE union exchange groups by bucket id; inside each bucket a chunked
  vectorized all-pairs mask finds overlaps (chunk × n_right bools —
  bounded memory on hot buckets);
- NO pair-dedupe exchange: a pair is emitted only in the bucket that
  contains ``max(l0, r0)`` — the overlap's start — which lands in
  exactly one bucket both sides replicated into.  (Same reasoning as
  the polygon-side-only cell join; the 2-D bbox join can't use it
  because its dedupe point is per-dimension — documented there.)

Exchange volume: the two projected, bucket-replicated interval tables
ride once; output pairs never re-shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _explode_side(side: int, id_col: str, t0_col: str, t1_col: str,
                  bucket_us: int):
    def fn(batch: pa.Table) -> pa.Table:
        t0 = batch[t0_col].to_numpy().astype(np.int64)
        t1 = batch[t1_col].to_numpy().astype(np.int64)
        ids = batch[id_col].to_numpy().astype(np.int64)
        b0 = t0 // bucket_us
        cnt = (t1 // bucket_us - b0 + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(t0), dtype=np.int64), cnt)
        within = np.arange(int(cnt.sum()), dtype=np.int64) - np.repeat(
            np.cumsum(cnt) - cnt, cnt
        )
        return pa.table({
            "_bkt": pa.array(b0[idx] + within),
            "_side": pa.array(np.full(len(idx), side, dtype=np.int8)),
            "_id": pa.array(ids[idx]),
            "_t0": pa.array(t0[idx]),
            "_t1": pa.array(t1[idx]),
        })

    return fn


def _join_bucket(bucket_us: int, l_name: str, r_name: str,
                 chunk: int = 512):
    def fn(group: pa.Table) -> pa.Table:
        side = group["_side"].to_numpy()
        li = np.nonzero(side == 0)[0]
        ri = np.nonzero(side == 1)[0]
        empty = pa.table({l_name: pa.array([], type=pa.int64()),
                          r_name: pa.array([], type=pa.int64())})
        if len(li) == 0 or len(ri) == 0:
            return empty
        bkt = int(group["_bkt"][0].as_py())
        lid = group["_id"].to_numpy()[li]
        l0 = group["_t0"].to_numpy()[li]
        l1 = group["_t1"].to_numpy()[li]
        rid = group["_id"].to_numpy()[ri]
        r0 = group["_t0"].to_numpy()[ri]
        r1 = group["_t1"].to_numpy()[ri]
        outs_l, outs_r = [], []
        for s in range(0, len(li), chunk):
            e = min(s + chunk, len(li))
            m = (l0[s:e, None] <= r1[None, :]) & (r0[None, :] <= l1[s:e, None])
            # dedupe across spanned buckets: keep the pair only where the
            # overlap START (max of starts) falls in THIS bucket
            start = np.maximum(l0[s:e, None], r0[None, :])
            m &= (start // bucket_us) == bkt
            a, b = np.nonzero(m)
            outs_l.append(lid[s:e][a])
            outs_r.append(rid[b])
        return pa.table({
            l_name: pa.array(np.concatenate(outs_l)),
            r_name: pa.array(np.concatenate(outs_r)),
        })

    return fn


def interval_join(left, right, bucket_us: int,
                  id_cols=("l_id", "r_id"),
                  l_cols=("_id", "_t0", "_t1"),
                  r_cols=("_id", "_t0", "_t1")):
    """(left, right) Datasets with int64 ``(_id, _t0, _t1)`` columns →
    overlap-pair Dataset named ``id_cols``.  See module docstring for
    the partitioning/dedup scheme."""
    lt = left.map_batches(
        _explode_side(0, *l_cols, bucket_us), batch_format="pyarrow",
        batch_size=None, zero_copy_batch=True,
    )
    rt = right.map_batches(
        _explode_side(1, *r_cols, bucket_us), batch_format="pyarrow",
        batch_size=None, zero_copy_batch=True,
    )
    from engine.rayds.shuffle import hash_exchange_fine_groups

    return hash_exchange_fine_groups(lt.union(rt), ["_bkt"],
                                     _join_bucket(bucket_us, *id_cols))
