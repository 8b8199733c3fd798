"""Brute-force parity for the trend/changepoint/k-core/EWMA batch
(each also oracle-checked at sf0.001 and sf0.01 via tools/check_oracle)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _to_table(res):
    if isinstance(res, pa.Table):
        return res
    return pa.concat_tables(list(res.iter_batches(batch_format="pyarrow")))


def _write_events(tmp_path, n=3000, seed=11):
    rng = np.random.default_rng(seed)
    eid = rng.permutation(np.arange(1, n + 1)).astype(np.int64)
    base = np.datetime64("2024-05-01T00:00:00", "us").astype(np.int64)
    # bursty days so the trend/changepoint statistics are nontrivial
    day = np.where(rng.random(n) < 0.6, rng.integers(0, 6, n),
                   rng.integers(6, 15, n))
    ts = base + day * 86_400_000_000 + rng.integers(0, 86_400_000_000, n)
    df = pd.DataFrame({
        "event_id": eid,
        "ts": ts.view("datetime64[us]"),
        "user_id": rng.integers(0, 23, n).astype(np.int64),
        "event_type": np.array(["click", "view", "purchase"])[
            rng.integers(0, 3, n)],
        "value": rng.uniform(0.0, 500.0, n),
    })
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "events.parquet"))
    return df


def test_mann_kendall_brute(ray_session, tmp_path):
    from __ray_entry__ import _q_mann_kendall

    df = _write_events(tmp_path)
    t = _to_table(_q_mann_kendall(str(tmp_path)))
    day = df["ts"].to_numpy().view("int64") // 86_400_000_000
    lo, hi = day.min(), day.max()
    dense = np.zeros(hi - lo + 1, dtype=np.int64)
    for d in day:
        dense[d - lo] += 1
    s = sum(int(np.sign(dense[j] - dense[i]))
            for i in range(len(dense)) for j in range(i + 1, len(dense)))
    _, c = np.unique(dense, return_counts=True)
    assert t["n_days"][0].as_py() == len(dense)
    assert t["s_stat"][0].as_py() == s
    assert t["tie_pairs2"][0].as_py() == int((c * (c - 1)).sum())


def test_cusum_changepoint_brute(ray_session, tmp_path):
    from __ray_entry__ import _q_cusum_changepoint

    df = _write_events(tmp_path)
    t = _to_table(_q_cusum_changepoint(str(tmp_path)))
    day = df["ts"].to_numpy().view("int64") // 86_400_000_000
    cents = np.floor(df["value"].to_numpy() * 100.0).astype(np.int64)
    lo, hi = day.min(), day.max()
    dense = np.zeros(hi - lo + 1, dtype=np.int64)
    for d, c in zip(day, cents):
        dense[d - lo] += c
    n = len(dense)
    s = np.cumsum(dense)
    best_day, best_dev = None, -1
    for tt in range(1, n):
        dev = abs(int(n) * int(s[tt - 1]) - tt * int(s[-1]))
        if dev > best_dev:
            best_day, best_dev = lo + tt - 1, dev
    assert t["split_day"][0].as_py() == best_day
    assert t["dev"][0].as_py() == best_dev
    # the burst construction must make a real changepoint (dev > 0)
    assert best_dev > 0


def test_k_core_brute(ray_session, tmp_path):
    from __ray_entry__ import _q_k_core, _KCORE_K, _KCORE_ROUNDS

    df = _write_events(tmp_path)
    t = (_to_table(_q_k_core(str(tmp_path))).to_pandas()
         .sort_values("node", ignore_index=True))
    eid = df["event_id"].to_numpy()
    eid = eid[eid <= 1000]
    x = eid % 397
    y = (eid // 397 + eid % 389) % 397
    m = x != y
    edges = set(zip(np.minimum(x[m], y[m]).tolist(),
                    np.maximum(x[m], y[m]).tolist()))
    for _ in range(_KCORE_ROUNDS):
        deg = {}
        for a, b in edges:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        keep = {v for v, d in deg.items() if d >= _KCORE_K}
        edges = {(a, b) for a, b in edges if a in keep and b in keep}
    deg = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    want = pd.DataFrame(sorted(deg.items()), columns=["node", "deg"])
    assert t["node"].tolist() == want["node"].tolist()
    assert t["deg"].tolist() == want["deg"].tolist()
    assert len(t) > 0  # peeling must leave a nontrivial core


def test_ewma_brute_and_run_gating(ray_session, tmp_path):
    from __ray_entry__ import _q_ewma_value

    df = _write_events(tmp_path, n=800)
    t = (_to_table(_q_ewma_value(str(tmp_path))).to_pandas()
         .set_index("event_id"))
    d = df.copy()
    d["ts_us"] = d["ts"].to_numpy().view("int64")
    d["cents"] = np.floor(d["value"].to_numpy() * 100.0).astype(np.int64)
    d = d.sort_values(["user_id", "ts_us", "event_id"], ignore_index=True)
    for u, sub in d.groupby("user_id"):
        c = sub["cents"].to_numpy()
        ids = sub["event_id"].to_numpy()
        for i in range(len(c)):
            num = den = 0
            for k in range(min(10, i + 1)):
                w = 1 << (9 - k)
                num += int(c[i - k]) * w
                den += w
            row = t.loc[ids[i]]
            assert row["ewma_num"] == num, (u, ids[i])
            assert row["ewma_den"] == den
            assert row["ewma"] == float(num) / float(den)
    assert len(t) == len(d)
