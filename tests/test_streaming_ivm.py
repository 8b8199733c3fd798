"""STREAMING ingestion simulation over the IVM merge: a standing
(event_type, day) rollup absorbs K time-ordered micro-batch deltas one
at a time — after EVERY step the maintained state must equal a full
batch recompute over everything seen so far; a final LATE out-of-order
batch (timestamps older than the watermark) must also merge exactly
(the partial-merge algebra is order-independent)."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from engine.rayds.shuffle import grouped_agg


def _partials(tbl: pa.Table):
    ds = ray.data.from_arrow(tbl).repartition(4)

    def fn(t: pa.Table) -> pa.Table:
        c = np.floor(t["value"].to_numpy() * 100.0).astype(np.int64)
        day = (t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
               // 86_400_000_000)
        return pa.table({
            "event_type": t["event_type"],
            "day": pa.array(day.astype(np.int64)),
            "_one": pa.array(np.ones(len(c), dtype=np.int64)),
            "cents": pa.array(c)})

    return grouped_agg(
        ds.map_batches(fn, batch_format="pyarrow", batch_size=None,
                       zero_copy_batch=True),
        ["event_type", "day"], [("_one", "sum"), ("cents", "sum")],
        ["n", "sum_cents"], plan="tree")


def _merge(state, delta):
    return grouped_agg(
        state.union(delta), ["event_type", "day"],
        [("n", "sum"), ("sum_cents", "sum")], ["n", "sum_cents"],
        plan="tree").materialize()


def _to_df(ds):
    t = pa.concat_tables(
        [b for b in ds.iter_batches(batch_format="pyarrow")])
    return t.to_pandas().sort_values(["event_type", "day"],
                                     ignore_index=True)


def test_streaming_microbatches_with_late_data(ray_session):
    rng = np.random.default_rng(3)
    DAY = 86_400_000_000
    n = 6000
    ts = rng.integers(0, 30 * DAY, size=n).astype(np.int64)
    et = rng.choice(["a", "b", "c"], size=n)
    val = np.round(rng.uniform(0, 50, size=n), 2)
    full = pa.table({
        "ts": pa.array(ts.view("datetime64[us]")),
        "event_type": pa.array(et.tolist()),
        "value": pa.array(val)})

    # 5 time-ordered micro-batches (days 0-5, 6-11, …) + 1 LATE batch
    order = np.argsort(ts, kind="stable")
    shuffled = full.take(pa.array(order))
    bounds = [0, 6, 12, 18, 24, 31]
    batches = []
    days = ts[order] // DAY
    for lo, hi in zip(bounds[:-1], bounds[1:]):
        m = (days >= lo) & (days < hi)
        batches.append(shuffled.filter(pa.array(m)))
    # hold back 300 OLD rows (watermark violators) as the late batch
    first = batches[0]
    late = first.slice(0, 300)
    batches[0] = first.slice(300)

    state = _partials(batches[0]).materialize()
    seen = [batches[0]]
    for b in batches[1:]:
        state = _merge(state, _partials(b))
        seen.append(b)
        want = _to_df(_partials(pa.concat_tables(seen)))
        got = _to_df(state)
        pd.testing.assert_frame_equal(got, want)

    # the late batch arrives AFTER everything else — merge still exact
    state = _merge(state, _partials(late))
    seen.append(late)
    want = _to_df(_partials(pa.concat_tables(seen)))
    pd.testing.assert_frame_equal(_to_df(state), want)
    # and the final state equals the rollup of the ORIGINAL table
    base = _to_df(_partials(full))
    pd.testing.assert_frame_equal(_to_df(state), base)
