"""Hypothesis property tests for the per-partition window kernels —
randomized key/ts/value shapes (heavy ties, duplicate timestamps,
single-row users) against pandas brute force."""

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings, strategies as st

import ray
import ray.data

from engine.ops.window import record_high_counts


def _to_table(res):
    if isinstance(res, ray.data.Dataset):
        return pa.concat_tables(
            [b for b in res.iter_batches(batch_format="pyarrow")])
    return res


rows = st.lists(
    st.tuples(st.integers(0, 5),        # user
              st.integers(0, 20),       # ts (heavy ties)
              st.integers(0, 6)),       # value (heavy ties)
    min_size=1, max_size=60)


@settings(max_examples=20, deadline=None)
@given(rows)
def test_record_high_random(ray_session, data):
    u = np.array([r[0] for r in data], dtype=np.int64)
    ts = np.array([r[1] for r in data], dtype=np.int64)
    v = np.array([r[2] for r in data], dtype=np.float64)
    eid = np.arange(len(data), dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({
        "user_id": pa.array(u),
        "ts": pa.array(ts.view("datetime64[us]")),
        "event_id": pa.array(eid),
        "value": pa.array(v)}))
    got = _to_table(record_high_counts(
        ds, "user_id", "ts", "event_id", "value")).to_pandas()
    got = got.sort_values("user_id", ignore_index=True)

    df = pd.DataFrame({"u": u, "ts": ts, "e": eid, "v": v}) \
        .sort_values(["u", "ts", "e"], ignore_index=True)
    recs, evs = {}, {}
    cur, mx = None, None
    for r in df.itertuples():
        if r.u != cur:
            cur, mx = r.u, None
        evs[r.u] = evs.get(r.u, 0) + 1
        if mx is None or r.v > mx:
            recs[r.u] = recs.get(r.u, 0) + 1
            mx = r.v
    assert got["user_id"].tolist() == sorted(recs)
    assert got["n_records"].tolist() == [recs[x] for x in sorted(recs)]
    assert got["n_events"].tolist() == [evs[x] for x in sorted(recs)]


@settings(max_examples=15, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 4), st.integers(0, 40)),
                min_size=1, max_size=50),
       st.integers(1, 8))
def test_sessionize_random(ray_session, data, gap):
    from engine.rayds.shuffle import sessionize

    u = np.array([r[0] for r in data], dtype=np.int64)
    ts = np.array([r[1] for r in data], dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({
        "user_id": pa.array(u), "ts_us": pa.array(ts)}))
    got = _to_table(sessionize(ds, "user_id", "ts_us", gap)).to_pandas()
    got = got.sort_values(["user_id", "session_start_us"],
                          ignore_index=True)

    want = []
    df = pd.DataFrame({"u": u, "ts": ts}).sort_values(
        ["u", "ts"], ignore_index=True)
    for uu, sub in df.groupby("u"):
        t = sub["ts"].to_numpy()
        new = np.r_[True, np.diff(t) > gap]
        starts = np.flatnonzero(new)
        sizes = np.diff(np.append(starts, len(t)))
        for s, n in zip(starts, sizes):
            want.append((uu, int(t[s]), int(n)))
    want.sort()
    assert list(zip(got["user_id"], got["session_start_us"],
                    got["n_events"])) == want
