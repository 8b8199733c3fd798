"""Brute-force parity for batch K: Q12 matrix, decorrelated
above-average filter, per-source dup profile."""

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


def test_above_avg_orders_brute(ray_session, tmp_path):
    from __ray_entry__ import _q_above_avg_orders

    rng = np.random.default_rng(19)
    n = 3000
    cust = rng.integers(1, 50, size=n).astype(np.int64)
    price = np.round(rng.uniform(10, 5000, size=n), 2)
    pq.write_table(pa.table({
        "o_orderkey": pa.array(np.arange(n, dtype=np.int64)),
        "o_custkey": pa.array(cust),
        "o_orderstatus": pa.array(["F"] * n),
        "o_totalprice": pa.array(price),
        "o_orderdate": pa.array(np.zeros(n, dtype=np.int64)
                                .view("datetime64[us]")),
        "o_orderpriority": pa.array(["x"] * n),
    }), str(tmp_path / "orders.parquet"))

    got = _to_table(_q_above_avg_orders(str(tmp_path))).to_pandas()
    got = got.sort_values("o_custkey", ignore_index=True)

    cents = np.rint(price * 100).astype(np.int64)
    df = pd.DataFrame({"c": cust, "v": cents})
    want_above, want_n = [], []
    for c in sorted(df["c"].unique()):
        v = df[df["c"] == c]["v"].to_numpy()
        want_above.append(int((v * len(v) > v.sum()).sum()))
        want_n.append(len(v))
    assert got["o_custkey"].tolist() == sorted(df["c"].unique())
    assert got["n_above_avg"].tolist() == want_above
    assert got["n_orders"].tolist() == want_n
    # the exact-integer tie rule: a customer whose orders are all
    # identical has zero above-average orders
    assert all(a < b for a, b in zip(want_above, want_n))


def test_dup_rate_by_source_brute(ray_session, tmp_path):
    from __ray_entry__ import _q_dup_rate_by_source

    texts = (["same text"] * 4 + ["uniq %d" % i for i in range(6)])
    src = ["a"] * 5 + ["b"] * 5
    pq.write_table(pa.table({
        "doc_id": pa.array(range(10), type=pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * 10),
        "source": pa.array(src),
        "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
    }), str(tmp_path / "documents.parquet"))

    got = _to_table(_q_dup_rate_by_source(str(tmp_path))).to_pandas()
    got = got.sort_values("source", ignore_index=True)
    # source a: 4×"same text" + 1 uniq → 2 distinct, 3 dups
    assert got["n_docs"].tolist() == [5, 5]
    assert got["n_distinct"].tolist() == [2, 5]
    assert got["n_dups"].tolist() == [3, 0]
