"""Brute-force parity for batch H: quantile normalization, longest
streak (gaps-and-islands), order-independent table checksums."""

import hashlib

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


def _events(tmp_path, n=3000, users=25, types=("a", "b", "c"), seed=3):
    rng = np.random.default_rng(seed)
    user = rng.integers(0, users, size=n).astype(np.int64)
    ts = rng.integers(0, 50_000, size=n).astype(np.int64)
    et = rng.choice(list(types), size=n)
    val = np.round(rng.uniform(0, 50, size=n), 4)
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


def test_quantile_normalize_brute(ray_session, tmp_path):
    from __ray_entry__ import _q_quantile_normalize

    df = _events(tmp_path)
    got = _to_table(_q_quantile_normalize(str(tmp_path))).to_pandas()
    got = got.sort_values("event_id", ignore_index=True)
    c = np.floor(df["v"].to_numpy() * 100.0).astype(np.int64)
    n = len(c)
    want = np.array([float((c <= x).sum()) / float(n) for x in c])
    assert np.array_equal(got["cdist"].to_numpy(), want)


def test_longest_streak_brute(ray_session, tmp_path):
    from __ray_entry__ import _q_longest_streak

    df = _events(tmp_path, types=("a", "b"))  # few types → long runs
    got = _to_table(_q_longest_streak(str(tmp_path))).to_pandas()
    got = got.sort_values("user_id", ignore_index=True)
    want = {}
    for u, sub in df.sort_values(["u", "ts", "eid"]).groupby("u"):
        best = cur = 0
        prev = None
        for t in sub["t"]:
            cur = cur + 1 if t == prev else 1
            prev = t
            best = max(best, cur)
        want[u] = best
    assert got["user_id"].tolist() == sorted(want)
    assert got["longest"].tolist() == [want[u] for u in sorted(want)]
    assert max(want.values()) >= 3  # runs actually exercised


def test_table_checksums_brute(ray_session, tmp_path):
    from __ray_entry__ import _q_table_checksums

    df = _events(tmp_path, n=2000)
    got = _to_table(_q_table_checksums(str(tmp_path))).to_pandas()
    got = got.sort_values("bucket", ignore_index=True)
    want = {}
    cnt = {}
    for r in df.itertuples():
        b = int(r.u) % 16
        fp = int(hashlib.md5(str(int(r.eid)).encode()).hexdigest()[:15],
                 16)
        want[b] = want.get(b, 0) ^ fp
        cnt[b] = cnt.get(b, 0) + 1
    assert got["bucket"].tolist() == sorted(want)
    assert got["checksum"].tolist() == [want[b] for b in sorted(want)]
    assert got["n"].tolist() == [cnt[b] for b in sorted(want)]


def test_table_checksums_order_independent(ray_session, tmp_path):
    from __ray_entry__ import _q_table_checksums

    _events(tmp_path, n=500, seed=9)
    a = _to_table(_q_table_checksums(str(tmp_path))).to_pandas() \
        .sort_values("bucket", ignore_index=True)
    # rewrite the same rows in reverse order → identical checksums
    t = pq.read_table(str(tmp_path / "events.parquet"))
    rev = t.take(pa.array(np.arange(t.num_rows)[::-1]))
    pq.write_table(rev, str(tmp_path / "events.parquet"))
    b = _to_table(_q_table_checksums(str(tmp_path))).to_pandas() \
        .sort_values("bucket", ignore_index=True)
    assert a.equals(b)
