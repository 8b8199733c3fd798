"""Brute-force parity for batch I: debounce, skyline, weighted avg."""

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


def test_debounce_brute(ray_session, tmp_path):
    from __ray_entry__ import _q_debounce_events

    rng = np.random.default_rng(41)
    n = 4000
    user = rng.integers(0, 20, size=n).astype(np.int64)
    # tight timestamps so the 5-min window actually suppresses
    ts = rng.integers(0, 3_600_000_000, size=n).astype(np.int64)
    et = rng.choice(["a", "b"], size=n)
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts.view("datetime64[us]")),
        "user_id": pa.array(user),
        "event_type": pa.array(et.tolist()),
        "value": pa.array(np.zeros(n)),
        "props": pa.array(["{}"] * n),
    }), str(tmp_path / "events.parquet"))

    got = sorted(_to_table(_q_debounce_events(str(tmp_path)))
                 ["event_id"].to_pylist())

    df = pd.DataFrame({"e": np.arange(n), "u": user, "t": et, "ts": ts})
    keep = []
    for (_, _), sub in df.sort_values(["u", "t", "ts", "e"]).groupby(
            ["u", "t"]):
        prev = None
        for r in sub.itertuples():
            if prev is None or r.ts - prev > 300_000_000:
                keep.append(r.e)
            prev = r.ts
    assert got == sorted(keep)
    assert 0 < len(keep) < n  # suppression actually happened


def _brute_skyline(x, y, k):
    out = []
    for i in range(len(x)):
        dom = False
        for j in range(len(x)):
            if i == j:
                continue
            if (x[j] >= x[i] and y[j] >= y[i]
                    and (x[j] > x[i] or y[j] > y[i])):
                dom = True
                break
        if not dom:
            out.append(k[i])
    return sorted(out)


def _run_skyline(tmp_path, price, dates, ray_blocks=5):
    from __ray_entry__ import _q_order_skyline

    n = len(price)
    pq.write_table(pa.table({
        "o_orderkey": pa.array(np.arange(n, dtype=np.int64)),
        "o_custkey": pa.array(np.zeros(n, dtype=np.int64)),
        "o_orderstatus": pa.array(["F"] * n),
        "o_totalprice": pa.array(price),
        "o_orderdate": pa.array(dates.view("datetime64[us]")),
        "o_orderpriority": pa.array(["x"] * n),
    }), str(tmp_path / "orders.parquet"))
    got = _to_table(_q_order_skyline(str(tmp_path)))
    return sorted(got["o_orderkey"].to_pylist())


def test_skyline_anticorrelated(ray_session, tmp_path):
    # anti-correlated: big frontier, the hard case
    n = 400
    rng = np.random.default_rng(7)
    price = np.round(1000.0 - np.arange(n) + rng.normal(0, 5, n), 2)
    dates = (np.arange(n, dtype=np.int64) * 86_400_000_000
             + rng.integers(0, 1000, n))
    x = np.rint(price * 100).astype(np.int64)
    want = _brute_skyline(x, dates, np.arange(n))
    got = _run_skyline(tmp_path, price, dates)
    assert got == want
    assert len(want) > 50


def test_skyline_duplicates_survive(ray_session, tmp_path):
    price = np.array([10.0, 10.0, 5.0, 10.0])
    dates = np.array([100, 100, 50, 90], dtype=np.int64)
    got = _run_skyline(tmp_path, price, dates)
    # the two exact duplicates are mutually non-dominating: both stay;
    # (5.0, 50) and (10.0, 90) are dominated
    assert got == [0, 1]


def test_brand_wavg_brute(ray_session, tmp_path):
    from __ray_entry__ import _q_brand_wavg_price

    rng = np.random.default_rng(11)
    n = 2000
    pk = rng.integers(1, 30, size=n).astype(np.int64)
    qty = rng.integers(1, 50, size=n).astype(np.float64)
    price = np.round(rng.uniform(10, 900, size=n), 2)
    pq.write_table(pa.table({
        "l_orderkey": pa.array(np.ones(n, dtype=np.int64)),
        "l_partkey": pa.array(pk),
        "l_suppkey": pa.array(np.ones(n, dtype=np.int64)),
        "l_linenumber": pa.array(np.arange(n, dtype=np.int32)),
        "l_quantity": pa.array(qty),
        "l_extendedprice": pa.array(price),
        "l_discount": pa.array(np.zeros(n)),
        "l_tax": pa.array(np.zeros(n)),
        "l_returnflag": pa.array(["N"] * n),
        "l_linestatus": pa.array(["O"] * n),
        "l_shipdate": pa.array(np.zeros(n, dtype=np.int64)
                               .view("datetime64[us]")),
    }), str(tmp_path / "lineitem.parquet"))
    brands = [f"B{i % 5}" for i in range(30)]
    pq.write_table(pa.table({
        "p_partkey": pa.array(np.arange(1, 31, dtype=np.int64)),
        "p_name": pa.array([f"n{i}" for i in range(30)]),
        "p_brand": pa.array(brands),
        "p_type": pa.array(["t"] * 30),
        "p_size": pa.array(np.ones(30, dtype=np.int32)),
        "p_retailprice": pa.array(np.ones(30)),
    }), str(tmp_path / "part.parquet"))

    got = _to_table(_q_brand_wavg_price(str(tmp_path))).to_pandas()
    got = got.sort_values("p_brand", ignore_index=True)
    cents = np.rint(price * 100).astype(np.int64)
    qi = qty.astype(np.int64)
    b = np.array([brands[p - 1] for p in pk])
    for i, br in enumerate(got["p_brand"]):
        m = b == br
        w = int((cents[m] * qi[m]).sum())
        q = int(qi[m].sum())
        assert got["sum_weighted_cents"][i] == w
        assert got["sum_qty"][i] == q
        assert got["wavg_cents"][i] == float(w) / float(q)
