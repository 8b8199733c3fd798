"""Brute-force parity for the round-3 TPC-H batch 2 driver queries
(Q10 returned revenue, Q15 top supplier incl. the ties path, Q17
small-quantity scalar subquery, Q19 disjunctive predicates) and the
min-max scaler — each on a synthesized production-schema parquet
layout, independent of the DuckDB oracle."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _us(dates):
    return pa.array(np.asarray(
        [np.datetime64(d, "us") for d in dates]).astype("datetime64[us]"))


def _to_table(res):
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return pa.concat_tables(
            [b for b in res.iter_batches(batch_format="pyarrow")])
    return res


def _write_lineitem(tmp_path, df):
    pq.write_table(pa.table({
        "l_orderkey": pa.array(df["okey"].to_numpy(np.int64)),
        "l_partkey": pa.array(df["pkey"].to_numpy(np.int64)),
        "l_suppkey": pa.array(df["skey"].to_numpy(np.int64)),
        "l_linenumber": pa.array(
            np.arange(len(df), dtype=np.int32)),
        "l_quantity": pa.array(df["qty"].to_numpy(np.float64)),
        "l_extendedprice": pa.array(df["price"].to_numpy(np.float64)),
        "l_discount": pa.array(df["disc"].to_numpy(np.float64)),
        "l_tax": pa.array(np.zeros(len(df))),
        "l_returnflag": pa.array(df["rf"].tolist()),
        "l_linestatus": pa.array(["O"] * len(df)),
        "l_shipdate": _us(df["ship"].tolist()),
    }), str(tmp_path / "lineitem.parquet"))


def _rand_lineitem(rng, n, n_orders=40, n_parts=12, n_supp=6):
    return pd.DataFrame({
        "okey": rng.integers(1, n_orders + 1, size=n),
        "pkey": rng.integers(1, n_parts + 1, size=n),
        "skey": rng.integers(1, n_supp + 1, size=n),
        "qty": rng.integers(1, 51, size=n).astype(float),
        "price": np.round(rng.uniform(10, 2000, size=n), 2),
        "disc": rng.integers(0, 11, size=n) / 100.0,
        "rf": rng.choice(["R", "N", "A"], size=n),
        "ship": rng.choice(
            ["1995-06-15", "1996-02-10", "1996-03-20", "1997-08-01"],
            size=n),
    })


def test_q10_returned_brute(ray_session, tmp_path):
    from __ray_entry__ import _q_q10_returned

    rng = np.random.default_rng(3)
    li = _rand_lineitem(rng, 2500)
    _write_lineitem(tmp_path, li)
    n_orders = 40
    odates = rng.choice(["1996-05-01", "1996-08-15", "1996-09-30",
                         "1996-11-01"], size=n_orders)
    ocust = rng.integers(1, 9, size=n_orders).astype(np.int64)
    pq.write_table(pa.table({
        "o_orderkey": pa.array(np.arange(1, n_orders + 1,
                                         dtype=np.int64)),
        "o_custkey": pa.array(ocust),
        "o_orderstatus": pa.array(["F"] * n_orders),
        "o_totalprice": pa.array(np.zeros(n_orders)),
        "o_orderdate": _us(odates.tolist()),
        "o_orderpriority": pa.array(["1-URGENT"] * n_orders),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        "c_custkey": pa.array(np.arange(1, 9, dtype=np.int64)),
        "c_name": pa.array([f"Customer#{i}" for i in range(1, 9)]),
    }), str(tmp_path / "customer.parquet"))

    got = _to_table(_q_q10_returned(str(tmp_path))).to_pandas()

    lo, hi = np.datetime64("1996-07-01"), np.datetime64("1996-10-01")
    owin = {k + 1: c for k, (d, c) in
            enumerate(zip(odates, ocust))
            if lo <= np.datetime64(d) < hi}
    rev = {}
    for r in li.itertuples():
        if r.rf == "R" and r.okey in owin:
            bp = int(round(r.price * 100)) * (100 - int(round(
                r.disc * 100)))
            rev[owin[r.okey]] = rev.get(owin[r.okey], 0) + bp
    want = sorted(rev.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got_s = sorted(zip(got["c_custkey"], got["revenue_bp"]),
                   key=lambda kv: (-kv[1], kv[0]))
    assert got_s == want
    assert all(got["c_name"] == "Customer#" +
               got["c_custkey"].astype(str))


def test_q15_ties_included(ray_session, tmp_path):
    from __ray_entry__ import _q_q15_top_supplier

    # two suppliers engineered to the SAME max revenue in the window
    li = pd.DataFrame({
        "okey": [1, 2, 3, 4, 5],
        "pkey": [1, 1, 1, 1, 1],
        "skey": [1, 2, 2, 3, 1],
        "qty": [1.0] * 5,
        "price": [100.0, 60.0, 40.0, 30.0, 999.0],
        "disc": [0.0] * 5,
        "rf": ["N"] * 5,
        "ship": ["1996-02-01", "1996-02-02", "1996-02-03",
                 "1996-02-04", "1997-06-01"],  # last one outside window
    })
    _write_lineitem(tmp_path, li)
    pq.write_table(pa.table({
        "s_suppkey": pa.array([1, 2, 3], type=pa.int64()),
        "s_name": pa.array(["S1", "S2", "S3"]),
        "s_nationkey": pa.array([0, 0, 0], type=pa.int32()),
        "s_acctbal": pa.array([0.0, 0.0, 0.0]),
    }), str(tmp_path / "supplier.parquet"))

    got = _to_table(_q_q15_top_supplier(str(tmp_path))).to_pandas()
    got = got.sort_values("s_suppkey", ignore_index=True)
    assert got["s_suppkey"].tolist() == [1, 2]     # both at 1_000_000 bp
    assert got["total_bp"].tolist() == [1_000_000, 1_000_000]
    assert got["s_name"].tolist() == ["S1", "S2"]


def test_q17_and_q19_brute(ray_session, tmp_path):
    from __ray_entry__ import _q_q17_small_qty, _q_q19_disjunct

    rng = np.random.default_rng(11)
    li = _rand_lineitem(rng, 3000, n_parts=20)
    _write_lineitem(tmp_path, li)
    brands = ["Brand#11", "Brand#12", "Brand#23", "Brand#34", "Brand#55"]
    pbrand = rng.choice(brands, size=20)
    psize = rng.integers(1, 51, size=20)
    pq.write_table(pa.table({
        "p_partkey": pa.array(np.arange(1, 21, dtype=np.int64)),
        "p_name": pa.array([f"part{i}" for i in range(20)]),
        "p_brand": pa.array(pbrand.tolist()),
        "p_type": pa.array(["t"] * 20),
        "p_size": pa.array(psize.astype(np.int32)),
        "p_retailprice": pa.array(np.ones(20)),
    }), str(tmp_path / "part.parquet"))

    # --- Q17 brute
    got17 = _to_table(_q_q17_small_qty(str(tmp_path)))
    bkeys = {k + 1 for k in range(20) if pbrand[k] == "Brand#11"}
    sub = li[li["pkey"].isin(bkeys)]
    g = sub.groupby("pkey")["qty"].agg(["sum", "count"])
    n_items = 0
    cents = 0
    for r in sub.itertuples():
        sq, n = g.loc[r.pkey, "sum"], g.loc[r.pkey, "count"]
        if 5 * int(r.qty) * int(n) < int(sq):
            n_items += 1
            cents += int(round(r.price * 100))
    assert got17["n_items"][0].as_py() == n_items
    assert got17["sum_cents"][0].as_py() == cents
    assert n_items > 0

    # --- Q19 brute
    got19 = _to_table(_q_q19_disjunct(str(tmp_path)))
    n_items = 0
    bp = 0
    for r in li.itertuples():
        b, s, q = pbrand[r.pkey - 1], int(psize[r.pkey - 1]), int(r.qty)
        hit = ((b == "Brand#12" and 1 <= s <= 25 and 1 <= q <= 21)
               or (b == "Brand#23" and 1 <= s <= 30 and 10 <= q <= 30)
               or (b == "Brand#34" and 1 <= s <= 40 and 20 <= q <= 40))
        if hit:
            n_items += 1
            bp += int(round(r.price * 100)) * (100 - int(round(
                r.disc * 100)))
    assert got19["n_items"][0].as_py() == n_items
    assert got19["revenue_bp"][0].as_py() == bp
    assert n_items > 0


def test_minmax_scaled_brute(ray_session, tmp_path):
    from __ray_entry__ import _q_minmax_scaled

    rng = np.random.default_rng(5)
    n = 2000
    v = rng.uniform(-50, 150, size=n)
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "value": pa.array(v),
    }), str(tmp_path / "events.parquet"))

    got = _to_table(_q_minmax_scaled(str(tmp_path))).to_pandas()
    got = got.sort_values("event_id", ignore_index=True)
    mn, mx = v.min(), v.max()
    want = (v - mn) / (mx - mn)
    assert np.array_equal(got["scaled"].to_numpy(), want)  # bit-exact
    assert got["scaled"].min() == 0.0 and got["scaled"].max() == 1.0
