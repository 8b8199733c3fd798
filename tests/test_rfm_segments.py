"""Brute-force parity for rfm_segments (also oracle-checked at
sf0.001/sf0.01): SQL ntile(5) semantics — remainder buckets first,
ties broken by user_id — across all three metrics."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _ntile5(order_idx):
    n = len(order_idx)
    q, r = divmod(n, 5)
    buckets = np.empty(n, dtype=np.int64)
    pos0 = np.arange(n)
    head = r * (q + 1)
    b = np.where(pos0 < head, pos0 // (q + 1),
                 r + (pos0 - head) // max(q, 1)) + 1
    buckets[order_idx] = b
    return buckets


def test_rfm_matches_brute(ray_session, tmp_path):
    from __ray_entry__ import _q_rfm_segments

    rng = np.random.default_rng(23)
    n = 5000
    base = np.datetime64("2024-04-01T00:00:00", "us").astype(np.int64)
    df = pd.DataFrame({
        "user_id": rng.integers(0, 143, n).astype(np.int64),  # not %5==0
        "ts": (base + rng.integers(0, 30 * 86_400_000_000, n))
        .view("datetime64[us]"),
        "value": rng.uniform(0.0, 700.0, n),
    })
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "events.parquet"))

    res = _q_rfm_segments(str(tmp_path))
    if not isinstance(res, pa.Table):  # sort-based plan returns a Dataset
        res = pa.concat_tables(list(res.iter_batches(batch_format="pyarrow")))
    t = res.to_pandas().sort_values(["r_q", "f_q", "m_q"],
                                    ignore_index=True)

    d = df.copy()
    d["ts_us"] = d["ts"].to_numpy().view("int64")
    d["cents"] = np.floor(d["value"].to_numpy() * 100.0).astype(np.int64)
    per = d.groupby("user_id").agg(
        last_ts=("ts_us", "max"), freq=("ts_us", "size"),
        mon=("cents", "sum")).reset_index()
    gday = per["last_ts"].max() // 86_400_000_000
    per["r_days"] = gday - per["last_ts"] // 86_400_000_000
    rq = _ntile5(np.lexsort((per["user_id"], per["r_days"])))
    fq = _ntile5(np.lexsort((per["user_id"], per["freq"])))
    mq = _ntile5(np.lexsort((per["user_id"], per["mon"])))
    want = (pd.DataFrame({"r_q": rq, "f_q": fq, "m_q": mq,
                          "mon": per["mon"]})
            .groupby(["r_q", "f_q", "m_q"])
            .agg(n_users=("mon", "size"), sum_cents=("mon", "sum"))
            .reset_index())
    got = t.reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype("int64"),
        want.sort_values(["r_q", "f_q", "m_q"],
                         ignore_index=True).astype("int64"))
    # quintiles must be balanced: each metric bucket holds n/5 ± 1 users
    for col in ("r_q", "f_q", "m_q"):
        sizes = got.groupby(col)["n_users"].sum()
        assert sizes.max() - sizes.min() <= 1
