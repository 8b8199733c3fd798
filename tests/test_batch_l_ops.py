"""Brute-force parity for batch L: rolling median, relational
division, forward as-of."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data


def _to_table(res):
    if isinstance(res, ray.data.Dataset):
        return pa.concat_tables(
            [b for b in res.iter_batches(batch_format="pyarrow")])
    return res


def _events(tmp_path, n, users, types, seed):
    rng = np.random.default_rng(seed)
    user = rng.integers(0, users, size=n).astype(np.int64)
    ts = rng.integers(0, 500_000, size=n).astype(np.int64)
    et = rng.choice(list(types), size=n)
    val = np.round(rng.uniform(0, 99, size=n), 2)
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts.view("datetime64[us]")),
        "user_id": pa.array(user),
        "event_type": pa.array(et.tolist()),
        "value": pa.array(val),
        "props": pa.array(["{}"] * n),
    }), str(tmp_path / "events.parquet"))
    return pd.DataFrame({"eid": np.arange(n), "u": user, "ts": ts,
                         "t": et, "v": val})


def test_rolling_median_brute(ray_session, tmp_path):
    from __ray_entry__ import _q_rolling_median

    df = _events(tmp_path, 2500, 30, ("a",), 3)
    got = _to_table(_q_rolling_median(str(tmp_path))).to_pandas()
    got = got.sort_values("event_id", ignore_index=True)
    med = {}
    for _, sub in df.sort_values(["u", "ts", "eid"]).groupby("u"):
        vals = sub["v"].to_list()
        for i, eid in enumerate(sub["eid"]):
            fr = sorted(vals[max(0, i - 4):i + 1])
            n = len(fr)
            lo, hi = fr[(n - 1) // 2], fr[n // 2]
            med[eid] = (lo + hi) * 0.5
    want = np.array([med[e] for e in got["event_id"]])
    assert np.array_equal(got["med"].to_numpy(), want)


def test_power_users_division_brute(ray_session, tmp_path):
    from __ray_entry__ import _q_power_users_division

    df = _events(tmp_path, 1200, 40, ("a", "b", "c", "d"), 7)
    # pin a third of the users to a single type so the division is
    # non-trivial, and rewrite the parquet with the pinned types
    df.loc[df["u"] % 3 == 0, "t"] = "a"
    pq.write_table(pa.table({
        "event_id": pa.array(df["eid"].to_numpy(np.int64)),
        "ts": pa.array(df["ts"].to_numpy(np.int64)
                       .view("datetime64[us]")),
        "user_id": pa.array(df["u"].to_numpy(np.int64)),
        "event_type": pa.array(df["t"].tolist()),
        "value": pa.array(df["v"].to_numpy()),
        "props": pa.array(["{}"] * len(df)),
    }), str(tmp_path / "events.parquet"))
    got = sorted(_to_table(_q_power_users_division(str(tmp_path)))
                 ["user_id"].to_pylist())
    want = sorted(u for u, sub in df.groupby("u")
                  if sub["t"].nunique() == 4)
    assert got == want
    assert 0 < len(want) < 40   # both sides of the division non-empty


def test_next_purchase_brute(ray_session, tmp_path):
    from __ray_entry__ import _q_next_purchase

    df = _events(tmp_path, 3000, 25, ("click", "purchase", "view"), 11)
    # users divisible by 5 never purchase → zero-purchase partitions
    df.loc[(df["u"] % 5 == 0) & (df["t"] == "purchase"), "t"] = "view"
    pq.write_table(pa.table({
        "event_id": pa.array(df["eid"].to_numpy(np.int64)),
        "ts": pa.array(df["ts"].to_numpy(np.int64)
                       .view("datetime64[us]")),
        "user_id": pa.array(df["u"].to_numpy(np.int64)),
        "event_type": pa.array(df["t"].tolist()),
        "value": pa.array(df["v"].to_numpy()),
        "props": pa.array(["{}"] * len(df)),
    }), str(tmp_path / "events.parquet"))
    got = _to_table(_q_next_purchase(str(tmp_path))).to_pandas()
    got = got.sort_values("event_id", ignore_index=True)
    want = {}
    for r in df[df["t"] == "click"].itertuples():
        later = df[(df["t"] == "purchase") & (df["u"] == r.u)
                   & (df["ts"] > r.ts)]["ts"]
        want[r.eid] = int(later.min()) if len(later) else -1
    assert got["event_id"].tolist() == sorted(want)
    assert got["next_purchase_us"].tolist() == [want[e] for e in
                                                sorted(want)]
    vals = list(want.values())
    assert any(v == -1 for v in vals) and any(v >= 0 for v in vals)


def test_nearest_purchase_brute(ray_session, tmp_path):
    from __ray_entry__ import _q_nearest_purchase

    df = _events(tmp_path, 3000, 25, ("click", "purchase", "view"), 29)
    # users divisible by 5 never purchase → the −1 branch is exercised
    df.loc[(df["u"] % 5 == 0) & (df["t"] == "purchase"), "t"] = "view"
    pq.write_table(pa.table({
        "event_id": pa.array(df["eid"].to_numpy(np.int64)),
        "ts": pa.array(df["ts"].to_numpy(np.int64)
                       .view("datetime64[us]")),
        "user_id": pa.array(df["u"].to_numpy(np.int64)),
        "event_type": pa.array(df["t"].tolist()),
        "value": pa.array(df["v"].to_numpy()),
        "props": pa.array(["{}"] * len(df)),
    }), str(tmp_path / "events.parquet"))
    got = _to_table(_q_nearest_purchase(str(tmp_path))).to_pandas()
    got = got.sort_values("event_id", ignore_index=True)
    want = {}
    for r in df[df["t"] == "click"].itertuples():
        p = df[(df["t"] == "purchase") & (df["u"] == r.u)]["ts"] \
            .to_numpy()
        if len(p) == 0:
            want[r.eid] = -1
            continue
        d = np.abs(p - r.ts)
        best = p[np.lexsort((p, d))][0]   # min |Δ|, tie → earlier ts
        want[r.eid] = int(best)
    assert got["event_id"].tolist() == sorted(want)
    assert got["nearest_us"].tolist() == [want[e] for e in
                                          sorted(want)]
    vals = list(want.values())
    assert any(v == -1 for v in vals) and any(v >= 0 for v in vals)
