"""Brute-force parity for batch F: record-high window counter,
per-dimension embedding stats, event-trigram mining, and degree
assortativity."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data

from engine.ops.vecagg import vector_dim_stats
from engine.ops.window import record_high_counts


def _to_table(res):
    if isinstance(res, ray.data.Dataset):
        return pa.concat_tables(
            [b for b in res.iter_batches(batch_format="pyarrow")])
    return res


def test_record_high_brute(ray_session):
    rng = np.random.default_rng(13)
    n = 5000
    user = rng.integers(0, 40, size=n).astype(np.int64)
    ts = rng.integers(0, 10_000, size=n).astype(np.int64)
    eid = np.arange(n, dtype=np.int64)
    # heavy value ties so strictness actually matters
    val = rng.integers(0, 25, size=n).astype(np.float64)
    ds = ray.data.from_arrow(pa.table({
        "user_id": pa.array(user),
        "ts": pa.array(ts.view("datetime64[us]")),
        "event_id": pa.array(eid),
        "value": pa.array(val),
    })).repartition(9)
    got = _to_table(record_high_counts(
        ds, "user_id", "ts", "event_id", "value")).to_pandas()
    got = got.sort_values("user_id", ignore_index=True)

    df = pd.DataFrame({"u": user, "ts": ts, "e": eid, "v": val})
    df = df.sort_values(["u", "ts", "e"], ignore_index=True)
    recs, evs = {}, {}
    cur_u, mx = None, None
    for r in df.itertuples():
        if r.u != cur_u:
            cur_u, mx = r.u, None
        evs[r.u] = evs.get(r.u, 0) + 1
        if mx is None or r.v > mx:
            recs[r.u] = recs.get(r.u, 0) + 1
            mx = r.v
        elif r.v > mx:
            mx = r.v
    want = pd.DataFrame(
        {"user_id": sorted(recs), "n_records": [recs[u] for u in
                                                sorted(recs)],
         "n_events": [evs[u] for u in sorted(recs)]})
    assert got["user_id"].tolist() == want["user_id"].tolist()
    assert got["n_records"].tolist() == want["n_records"].tolist()
    assert got["n_events"].tolist() == want["n_events"].tolist()


def test_record_high_all_ties_and_single(ray_session):
    ds = ray.data.from_arrow(pa.table({
        "user_id": pa.array([1, 1, 1, 2], type=pa.int64()),
        "ts": pa.array(np.array([1, 2, 3, 1], dtype=np.int64)
                       .view("datetime64[us]")),
        "event_id": pa.array([1, 2, 3, 4], type=pa.int64()),
        "value": pa.array([5.0, 5.0, 5.0, 9.0]),
    }))
    got = _to_table(record_high_counts(
        ds, "user_id", "ts", "event_id", "value")).to_pandas()
    got = got.sort_values("user_id", ignore_index=True)
    assert got["n_records"].tolist() == [1, 1]  # ties are never records


def test_dim_stats_exact(ray_session):
    rng = np.random.default_rng(5)
    n, d = 400, 8
    emb = rng.normal(scale=0.3, size=(n, d)).astype(np.float32)
    ds = ray.data.from_arrow(pa.table({
        "embedding": pa.array(list(emb), type=pa.list_(pa.float32())),
    })).repartition(7)
    got = vector_dim_stats(ds, "embedding").to_pandas()
    mv = np.rint(emb.astype(np.float64) * 1e6).astype(np.int64)
    for i in range(d):
        s = int(mv[:, i].sum())
        ss = int((mv[:, i].astype(object) ** 2).sum())
        assert got["n"][i] == n
        assert got["mean_micro"][i] == float(s) / float(n)
        assert got["var_micro2"][i] == float(n * ss - s * s) / float(n * n)


def test_dim_stats_ragged_raises(ray_session):
    ds = ray.data.from_arrow(pa.table({
        "embedding": pa.array([[1.0, 2.0], [1.0]],
                              type=pa.list_(pa.float32())),
    }))
    import pytest

    with pytest.raises(Exception):
        vector_dim_stats(ds, "embedding")


def test_sequence_ngrams_brute(ray_session, tmp_path):
    from __ray_entry__ import _q_sequence_ngrams

    rng = np.random.default_rng(23)
    n = 4000
    user = rng.integers(0, 30, size=n).astype(np.int64)
    ts = rng.integers(0, 100_000, size=n).astype(np.int64)
    et = rng.choice(["a", "b", "c"], size=n)
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts.view("datetime64[us]")),
        "user_id": pa.array(user),
        "event_type": pa.array(et.tolist()),
        "value": pa.array(np.zeros(n)),
        "props": pa.array(["{}"] * n),
    }), str(tmp_path / "events.parquet"))

    got = _to_table(_q_sequence_ngrams(str(tmp_path))).to_pandas()

    df = pd.DataFrame({"u": user, "ts": ts, "e": np.arange(n),
                       "t": et}).sort_values(["u", "ts", "e"],
                                             ignore_index=True)
    cnt = {}
    for i in range(len(df) - 2):
        if df["u"][i] == df["u"][i + 1] == df["u"][i + 2]:
            k = (df["t"][i], df["t"][i + 1], df["t"][i + 2])
            cnt[k] = cnt.get(k, 0) + 1
    want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got_t = list(zip(zip(got["e1"], got["e2"], got["e3"]), got["n"]))
    got_t.sort(key=lambda kv: (-kv[1], kv[0]))
    assert got_t == want


def test_degree_assortativity_brute(ray_session, tmp_path):
    from __ray_entry__ import _q_degree_assortativity

    rng = np.random.default_rng(31)
    n = 3000
    pk = rng.integers(1, 60, size=n).astype(np.int64)
    ok = rng.integers(1, 200, size=n).astype(np.int64)
    pq.write_table(pa.table({
        "l_orderkey": pa.array(ok), "l_partkey": pa.array(pk),
        "l_suppkey": pa.array(np.ones(n, dtype=np.int64)),
        "l_linenumber": pa.array(np.arange(n, dtype=np.int32)),
        "l_quantity": pa.array(np.ones(n)),
        "l_extendedprice": pa.array(np.ones(n)),
        "l_discount": pa.array(np.zeros(n)),
        "l_tax": pa.array(np.zeros(n)),
        "l_returnflag": pa.array(["N"] * n),
        "l_linestatus": pa.array(["O"] * n),
        "l_shipdate": pa.array(np.zeros(n, dtype=np.int64)
                               .view("datetime64[us]")),
    }), str(tmp_path / "lineitem.parquet"))

    got = _to_table(_q_degree_assortativity(str(tmp_path)))

    pairs = sorted(set(zip(pk.tolist(), ok.tolist())))
    from collections import Counter
    dp = Counter(p for p, _ in pairs)
    do = Counter(o for _, o in pairs)
    xs = np.array([dp[p] for p, o in pairs], dtype=np.float64)
    ys = np.array([do[o] for p, o in pairs], dtype=np.float64)
    want = np.corrcoef(xs, ys)[0, 1]
    assert got["n"][0].as_py() == len(pairs)
    assert abs(got["corr"][0].as_py() - want) < 1e-9
