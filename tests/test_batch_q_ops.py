"""Parity for batch Q: LOO target encoding and the Bloom FPR audit."""

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


def test_target_encode_brute(ray_session, tmp_path):
    from __ray_entry__ import _q_target_encode_type

    rng = np.random.default_rng(3)
    n = 2500
    et = rng.choice(["a", "b", "c"], size=n).tolist() + ["solo"]
    n += 1
    val = np.round(rng.uniform(0, 80, size=n), 2)
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(np.zeros(n, dtype=np.int64)
                       .view("datetime64[us]")),
        "user_id": pa.array(np.zeros(n, dtype=np.int64)),
        "event_type": pa.array(et),
        "value": pa.array(val),
        "props": pa.array(["{}"] * n),
    }), str(tmp_path / "events.parquet"))

    got = _to_table(_q_target_encode_type(str(tmp_path))).to_pandas()
    got = got.sort_values("event_id", ignore_index=True)

    cents = np.rint(val * 100).astype(np.int64)
    df = pd.DataFrame({"t": et, "c": cents})
    g = df.groupby("t")["c"].agg(["sum", "count"])
    want = np.empty(n)
    for i, (t, c) in enumerate(zip(et, cents)):
        s, cnt = int(g.loc[t, "sum"]), int(g.loc[t, "count"])
        want[i] = float(s - c) / float(cnt - 1) if cnt > 1 else -1.0
    assert np.array_equal(got["loo_cents"].to_numpy(), want)
    assert want[-1] == -1.0  # the singleton category hit the sentinel


def test_bloom_fpr_bound(ray_session, tmp_path):
    from __ray_entry__ import _q_bloom_filter_fpr

    rng = np.random.default_rng(5)
    n = 40_000
    user = rng.integers(0, 20_000, size=n).astype(np.int64)
    # only users < 500 ever purchase → a large non-member probe set
    et = np.where(user < 500,
                  rng.choice(["purchase", "click"], size=n),
                  "click")
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(np.zeros(n, dtype=np.int64)
                       .view("datetime64[us]")),
        "user_id": pa.array(user),
        "event_type": pa.array(et.tolist()),
        "value": pa.array(np.zeros(n)),
        "props": pa.array(["{}"] * n),
    }), str(tmp_path / "events.parquet"))

    t = _q_bloom_filter_fpr(str(tmp_path))
    n_users = t["n_users"][0].as_py()
    n_members = t["n_members"][0].as_py()
    n_fp = t["n_false_pos"][0].as_py()
    assert 0 < n_members < n_users
    assert n_members <= 500
    # 1 MiB bitmap, k=2, ≤500 members → FPR far under 1%
    assert n_fp <= max(2, n_users // 100)
