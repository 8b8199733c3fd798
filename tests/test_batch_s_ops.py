"""Brute-force parity for batch S: multivariate Cramer OLS and bounce
rate."""

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


def test_regr2_recovers_planted_coefficients(ray_session, tmp_path):
    from __ray_entry__ import _q_regr2_price

    rng = np.random.default_rng(3)
    n = 5000
    qty = rng.integers(1, 51, size=n).astype(np.float64)
    disc = rng.integers(0, 11, size=n) / 100.0
    # plant price = 10.00 + 3.50*qty - 0.75*disc_pct dollars + noise
    cents = np.rint(1000 + 350 * qty - 75 * (disc * 100)
                    + rng.normal(0, 40, size=n)).astype(np.int64)
    pq.write_table(pa.table({
        "l_orderkey": pa.array(np.ones(n, dtype=np.int64)),
        "l_partkey": pa.array(np.ones(n, dtype=np.int64)),
        "l_suppkey": pa.array(np.ones(n, dtype=np.int64)),
        "l_linenumber": pa.array(np.arange(n, dtype=np.int32)),
        "l_quantity": pa.array(qty),
        "l_extendedprice": pa.array(cents / 100.0),
        "l_discount": pa.array(disc),
        "l_tax": pa.array(np.zeros(n)),
        "l_returnflag": pa.array(["N"] * n),
        "l_linestatus": pa.array(["O"] * n),
        "l_shipdate": pa.array(np.zeros(n, dtype=np.int64)
                               .view("datetime64[us]")),
    }), str(tmp_path / "lineitem.parquet"))

    got = _to_table(_q_regr2_price(str(tmp_path)))
    # parity with numpy lstsq on the same exact design
    X = np.stack([np.ones(n), np.rint(qty),
                  np.rint(disc * 100)], axis=1)
    coef, *_ = np.linalg.lstsq(X, cents.astype(np.float64), rcond=None)
    assert abs(got["b0"][0].as_py() - coef[0]) < 1e-6 * abs(coef[0]) + 1
    assert abs(got["b_qty"][0].as_py() - coef[1]) < 1e-6
    assert abs(got["b_disc"][0].as_py() - coef[2]) < 1e-4
    # and the planted truth is recovered within noise
    assert abs(got["b_qty"][0].as_py() - 350.0) < 2.0
    assert abs(got["b_disc"][0].as_py() + 75.0) < 2.0


def test_bounce_rate_brute(ray_session, tmp_path):
    from __ray_entry__ import _q_bounce_rate

    rng = np.random.default_rng(11)
    n = 3000
    user = rng.integers(0, 25, size=n).astype(np.int64)
    # wide spread → plenty of singleton sessions
    ts = rng.integers(0, 40 * 86_400_000_000, size=n).astype(np.int64)
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts.view("datetime64[us]")),
        "user_id": pa.array(user),
        "event_type": pa.array(["x"] * n),
        "value": pa.array(np.zeros(n)),
        "props": pa.array(["{}"] * n),
    }), str(tmp_path / "events.parquet"))

    got = _to_table(_q_bounce_rate(str(tmp_path))).to_pandas()
    got = got.sort_values("user_id", ignore_index=True)

    GAP = 1_800_000_000
    df = pd.DataFrame({"u": user, "ts": ts}).sort_values(
        ["u", "ts"], ignore_index=True)
    ns, nb = {}, {}
    for u, sub in df.groupby("u"):
        t = sub["ts"].to_numpy()
        new = np.r_[True, np.diff(t) > GAP]
        sizes = np.diff(np.append(np.flatnonzero(new), len(t)))
        ns[u] = len(sizes)
        nb[u] = int((sizes == 1).sum())
    assert got["user_id"].tolist() == sorted(ns)
    assert got["n_sessions"].tolist() == [ns[u] for u in sorted(ns)]
    assert got["n_bounce"].tolist() == [nb[u] for u in sorted(ns)]
    assert sum(nb.values()) > 0


def test_ab_test_ztest_planted(ray_session, tmp_path):
    from __ray_entry__ import _q_ab_test_ztest

    import math

    rng = np.random.default_rng(7)
    n = 8000
    user = rng.integers(0, 1000, size=n).astype(np.int64)
    arm = user % 2
    # arm 0 converts at ~30%, arm 1 at ~10% → strongly positive z
    p = np.where(arm == 0, 0.3, 0.1)
    et = np.where(rng.random(n) < p, "purchase", "click")
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(np.zeros(n, dtype=np.int64)
                       .view("datetime64[us]")),
        "user_id": pa.array(user),
        "event_type": pa.array(et.tolist()),
        "value": pa.array(np.zeros(n)),
        "props": pa.array(["{}"] * n),
    }), str(tmp_path / "events.parquet"))

    t = _q_ab_test_ztest(str(tmp_path))
    n1, x1 = t["n_a"][0].as_py(), t["conv_a"][0].as_py()
    n2, x2 = t["n_b"][0].as_py(), t["conv_b"][0].as_py()
    assert n1 == int((arm == 0).sum())
    assert x1 == int(((arm == 0) & (et == "purchase")).sum())
    p1, p2 = x1 / n1, x2 / n2
    pp = (x1 + x2) / (n1 + n2)
    se = math.sqrt((pp * (1.0 - pp)) * (1.0 / n1 + 1.0 / n2))
    assert t["z"][0].as_py() == (p1 - p2) / se
    assert t["z"][0].as_py() > 10  # the planted effect is detected
