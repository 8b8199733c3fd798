"""Brute-force parity for batch M: two-sample drift monitor and SAX
symbolization."""

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


def _events(tmp_path, n, seed, shift=False):
    rng = np.random.default_rng(seed)
    user = rng.integers(0, 30, size=n).astype(np.int64)
    ts = rng.integers(0, 1_000_000, size=n).astype(np.int64)
    val = np.round(rng.uniform(0, 100, size=n), 2)
    if shift:
        # drift the second half upward so chi2 terms are non-trivial
        val = np.where(ts > 500_000, np.minimum(val + 30, 100.0), val)
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts.view("datetime64[us]")),
        "user_id": pa.array(user),
        "event_type": pa.array(["x"] * n),
        "value": pa.array(val),
        "props": pa.array(["{}"] * n),
    }), str(tmp_path / "events.parquet"))
    return pd.DataFrame({"eid": np.arange(n), "u": user, "ts": ts,
                         "v": val})


def test_value_drift_brute(ray_session, tmp_path):
    from __ray_entry__ import _q_value_drift

    df = _events(tmp_path, 4000, 3, shift=True)
    got = _to_table(_q_value_drift(str(tmp_path))).to_pandas()
    got = got.sort_values("bucket", ignore_index=True)

    ts, v = df["ts"].to_numpy(), df["v"].to_numpy()
    mid = (int(ts.min()) + int(ts.max())) // 2
    vmn, vmx = float(v.min()), float(v.max())
    b = np.minimum((((v - vmn) / (vmx - vmn)) * 20).astype(np.int64),
                   19)
    isb = ts > mid
    ca = np.bincount(b[~isb], minlength=20)
    cb = np.bincount(b[isb], minlength=20)
    na, nb = int(ca.sum()), int(cb.sum())
    assert got["count_a"].tolist() == ca.tolist()
    assert got["count_b"].tolist() == cb.tolist()
    for i in range(20):
        d = na * nb * int(ca[i] + cb[i])
        n_ = int(ca[i]) * nb - int(cb[i]) * na
        want = float(n_ * n_) / float(d) if d else 0.0
        assert got["chi2_term"][i] == want
    # drift actually detected: the statistic is clearly nonzero
    assert got["chi2_term"].sum() > 50


def test_paa_symbols_brute(ray_session, tmp_path):
    from __ray_entry__ import _q_paa_symbols

    df = _events(tmp_path, 3000, 7)
    got = _to_table(_q_paa_symbols(str(tmp_path))).to_pandas()
    got = got.sort_values(["user_id", "seg"], ignore_index=True)

    rows = []
    for u, sub in df.sort_values(["u", "ts", "eid"]).groupby("u"):
        cents = np.rint(sub["v"].to_numpy() * 100).astype(np.int64)
        n = len(cents)
        seg = np.arange(n) * 8 // n
        for s in np.unique(seg):
            m = seg == s
            ssum, scnt = int(cents[m].sum()), int(m.sum())
            sym = sum(ssum > t * 100 * scnt for t in (25, 50, 75))
            rows.append((u, int(s), sym))
    want = pd.DataFrame(rows, columns=["user_id", "seg", "symbol"])
    assert got["user_id"].tolist() == want["user_id"].tolist()
    assert got["seg"].tolist() == want["seg"].tolist()
    assert got["symbol"].tolist() == want["symbol"].tolist()
    assert got["symbol"].nunique() > 1
