"""Brute-force parity for the gains table, with a non-divisible user
count so the ntile remainder rule matters."""

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


def test_decile_gains_brute(ray_session, tmp_path):
    from __ray_entry__ import _q_decile_gains

    rng = np.random.default_rng(3)
    n = 4000
    # 73 users → q=7, r=3 (remainder buckets exercised); spend ties too
    user = rng.integers(0, 73, size=n).astype(np.int64)
    val = rng.integers(1, 30, size=n) / 1.0
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(np.zeros(n, dtype=np.int64)
                       .view("datetime64[us]")),
        "user_id": pa.array(user),
        "event_type": pa.array(["x"] * n),
        "value": pa.array(val),
        "props": pa.array(["{}"] * n),
    }), str(tmp_path / "events.parquet"))

    got = _to_table(_q_decile_gains(str(tmp_path))).to_pandas()
    got = got.sort_values("decile", ignore_index=True)

    cents = np.floor(val * 100).astype(np.int64)
    spend = pd.DataFrame({"u": user, "c": cents}).groupby("u")["c"] \
        .sum().reset_index()
    spend = spend.sort_values(["c", "u"], ascending=[False, True],
                              ignore_index=True)
    m = len(spend)
    q, r = divmod(m, 10)
    dec = np.empty(m, dtype=np.int64)
    pos = 0
    for b in range(10):
        size = q + 1 if b < r else q
        dec[pos:pos + size] = b + 1
        pos += size
    spend["dec"] = dec
    g = spend.groupby("dec")["c"].agg(["count", "sum"])
    assert got["n_users"].tolist() == g["count"].tolist()
    assert got["cents"].tolist() == g["sum"].tolist()
    cum = g["sum"].cumsum()
    total = int(g["sum"].sum())
    for i in range(10):
        assert got["cum_share"][i] == float(int(cum.iloc[i])) / float(
            total)
    assert got["cum_share"].iloc[-1] == 1.0
    # gains curve is concave-ish: first decile holds the biggest share
    assert got["cents"][0] == g["sum"].max()
