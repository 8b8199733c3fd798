"""Ordered multi-step FUNNEL analysis: how many keys (users) completed
step 1, then step 2 strictly after it, then step 3 after that, …

The product-analytics sequential-pattern operator.  Scale shape: the
event stream is pre-projected to (key, ts, step) with non-step events
dropped BEFORE the single hash exchange on the key; inside each
partition the whole chain is vectorized — one lexsort by (key, ts),
then per step one masked ``minimum.reduceat`` per key segment ("first
ts of step i strictly after the key's step-i−1 ts"); an unreached
previous step propagates automatically (nothing is > INT64_MAX).  Each
partition emits nsteps partial counts; a tree-fold grouped aggregate
reduces them to the nsteps-row result — the driver never sees keys.

Skew contract: one key's step events fit a partition (shared with
sessionize / the exact grouped quantiles).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

_UNSET = np.iinfo(np.int64).max


def funnel_counts(ds, key: str, ts_col: str, steps: list[str],
                  type_col: str = "event_type", num_parts: int = 64):
    """→ Dataset (step BIGINT 1-based, users BIGINT): users completing
    each ordered prefix of ``steps`` (strictly increasing timestamps)."""
    import pyarrow.compute as pc

    from engine.rayds.shuffle import grouped_agg

    step_arr = pa.array(steps)

    def prep(batch: pa.Table) -> pa.Table:
        et = batch[type_col].combine_chunks()
        sidx = pc.index_in(et, value_set=step_arr)
        m = pc.is_valid(sidx)
        t = batch[ts_col].combine_chunks()
        if pa.types.is_timestamp(t.type):
            t = t.cast(pa.int64())
        return pa.table({
            "_u": batch[key].combine_chunks().filter(m),
            "_t": t.filter(m),
            "_s": sidx.filter(m).cast(pa.int64()),
        })

    part = ds.map_batches(prep, batch_format="pyarrow", batch_size=None,
                          zero_copy_batch=True)
    nsteps = len(steps)

    def part_fn(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_part"])
        if g.num_rows == 0:
            return pa.table({
                "step": pa.array(np.arange(1, nsteps + 1), type=pa.int64()),
                "users": pa.array(np.zeros(nsteps), type=pa.int64()),
            })
        from engine.ops.stats import _sortable

        u = _sortable(g["_u"].to_numpy(zero_copy_only=False))
        t = g["_t"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = g["_s"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((t, u))
        u, t, s = u[order], t[order], s[order]
        starts = np.nonzero(np.r_[True, u[1:] != u[:-1]])[0]
        seg = np.cumsum(np.r_[True, u[1:] != u[:-1]]) - 1
        t_prev = np.full(len(starts), np.iinfo(np.int64).min)
        counts = np.zeros(nsteps, dtype=np.int64)
        for i in range(nsteps):
            mask = (s == i) & (t > t_prev[seg])
            val = np.where(mask, t, _UNSET)
            m = np.minimum.reduceat(val, starts)
            t_prev = m
            counts[i] = int((m < _UNSET).sum())
        return pa.table({
            "step": pa.array(np.arange(1, nsteps + 1), type=pa.int64()),
            "users": pa.array(counts, type=pa.int64()),
        })

    from engine.rayds.shuffle import hash_exchange_groups

    partials = hash_exchange_groups(part, ["_u"], part_fn, num_parts)
    return grouped_agg(partials, ["step"], [("users", "sum")], ["users"],
                       plan="tree")
