"""Brute-force parity for batch P: FK audit (with PLANTED orphans) and
percent_rank."""

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


def test_fk_violations_planted(ray_session, tmp_path):
    from __ray_entry__ import _q_fk_violations

    rng = np.random.default_rng(3)
    n = 2000
    # orders 1..80 exist; lineitem references 1..90 → 10 orphan keys
    okey = rng.integers(1, 91, size=n).astype(np.int64)
    pq.write_table(pa.table({
        "l_orderkey": pa.array(okey),
        "l_partkey": pa.array(np.ones(n, dtype=np.int64)),
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
    # orders reference customers 1..30; customers 1..25 exist → orphans
    ocust = rng.integers(1, 31, size=80).astype(np.int64)
    pq.write_table(pa.table({
        "o_orderkey": pa.array(np.arange(1, 81, dtype=np.int64)),
        "o_custkey": pa.array(ocust),
        "o_orderstatus": pa.array(["F"] * 80),
        "o_totalprice": pa.array(np.ones(80)),
        "o_orderdate": pa.array(np.zeros(80, dtype=np.int64)
                                .view("datetime64[us]")),
        "o_orderpriority": pa.array(["x"] * 80),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        "c_custkey": pa.array(np.arange(1, 26, dtype=np.int64)),
        "c_name": pa.array([f"c{i}" for i in range(25)]),
    }), str(tmp_path / "customer.parquet"))

    got = _to_table(_q_fk_violations(str(tmp_path))).to_pandas()
    got = got.set_index("relationship")["n_orphans"]
    want_li = len(set(okey.tolist()) - set(range(1, 81)))
    want_o = len(set(ocust.tolist()) - set(range(1, 26)))
    assert got["lineitem->orders"] == want_li
    assert got["orders->customer"] == want_o
    assert want_li > 0 and want_o > 0  # orphans actually planted


def test_percent_rank_brute(ray_session, tmp_path):
    from __ray_entry__ import _q_priority_percent_rank

    rng = np.random.default_rng(9)
    n = 3000
    prio = rng.choice(["1-URGENT", "3-MEDIUM", "5-LOW"], size=n)
    # heavy ties so the shared-rank rule matters
    price = rng.integers(1, 40, size=n) * 1.0
    pq.write_table(pa.table({
        "o_orderkey": pa.array(np.arange(n, dtype=np.int64)),
        "o_custkey": pa.array(np.zeros(n, dtype=np.int64)),
        "o_orderstatus": pa.array(["F"] * n),
        "o_totalprice": pa.array(price),
        "o_orderdate": pa.array(np.zeros(n, dtype=np.int64)
                                .view("datetime64[us]")),
        "o_orderpriority": pa.array(prio.tolist()),
    }), str(tmp_path / "orders.parquet"))

    got = _to_table(_q_priority_percent_rank(str(tmp_path))) \
        .to_pandas().sort_values("o_orderkey", ignore_index=True)

    df = pd.DataFrame({"k": np.arange(n), "p": prio,
                       "c": np.rint(price * 100).astype(np.int64)})
    want = np.empty(n)
    for _, sub in df.groupby("p"):
        c = sub["c"].to_numpy()
        m = len(c)
        for i, (k, v) in enumerate(zip(sub["k"], c)):
            rank0 = int((c < v).sum())
            want[k] = rank0 / (m - 1) if m > 1 else 0.0
    assert np.array_equal(got["pr"].to_numpy(), want)
