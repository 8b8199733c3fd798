"""Brute-force parity tests for the round-3 relational driver queries
(correlated EXISTS, left-outer distribution with zero bucket,
conditional revenue share, scalar-subquery + anti join, row-set
INTERSECT, sessionize→quantile composition).

Each test synthesizes a tiny parquet layout with the production schema
into tmp_path and compares the ``_q_`` function's result against a
pandas/numpy brute force — independent of the DuckDB oracle the driver
runs (tools/check_oracle.py covers that side)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(day_offsets_us):
    base = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)
    return pa.array((base + np.asarray(day_offsets_us, dtype=np.int64))
                    .view("datetime64[us]"))


def _to_table(res):
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return pa.concat_tables(
            [b for b in res.iter_batches(batch_format="pyarrow")])
    return res


def test_users_both_halves_brute(ray_session, tmp_path):
    from __ray_entry__ import _q_users_both_halves

    rng = np.random.default_rng(7)
    n = 4000
    user = rng.integers(0, 60, size=n)
    # spread over the month; some users confined to one half by id
    off = rng.integers(0, 30 * 86_400_000_000, size=n)
    half_len = 15 * 86_400_000_000
    off = np.where(user % 3 == 0, off % half_len, off)          # first only
    off = np.where(user % 3 == 1, off % half_len + half_len, off)  # second
    pq.write_table(pa.table({
        "user_id": pa.array(user.astype(np.int64)),
        "ts": _ts(off),
    }), str(tmp_path / "events.parquet"))

    got = sorted(_to_table(_q_users_both_halves(str(tmp_path)))
                 ["user_id"].to_pylist())
    mid = 15 * 86_400_000_000
    first = set(user[off < mid].tolist())
    second = set(user[off >= mid].tolist())
    assert got == sorted(first & second)
    assert len(got) > 0


def test_session_quantiles_brute(ray_session, tmp_path):
    from __ray_entry__ import _q_session_quantiles

    rng = np.random.default_rng(11)
    n = 3000
    user = rng.integers(0, 40, size=n).astype(np.int64)
    off = rng.integers(0, 5 * 86_400_000_000, size=n)
    pq.write_table(pa.table({
        "user_id": pa.array(user), "ts": _ts(off),
    }), str(tmp_path / "events.parquet"))

    t = _q_session_quantiles(str(tmp_path))

    gap = 1_800_000_000
    durs = []
    df = pd.DataFrame({"u": user, "ts": off}).sort_values(["u", "ts"])
    for _, g in df.groupby("u"):
        ts = g["ts"].to_numpy()
        new = np.ones(len(ts), dtype=bool)
        new[1:] = (ts[1:] - ts[:-1]) > gap
        starts = np.nonzero(new)[0]
        ends = np.append(starts[1:], len(ts)) - 1
        durs.extend((ts[ends] - ts[starts]).tolist())
    durs = np.sort(np.asarray(durs, dtype=np.float64))
    assert t["n_sessions"][0].as_py() == len(durs)
    for q, col in [(0.5, "p50_dur"), (0.9, "p90_dur")]:
        h = (len(durs) - 1) * q
        lo, hi = int(np.floor(h)), int(np.ceil(h))
        frac = h - lo
        expect = durs[lo] * (1 - frac) + durs[hi] * frac
        assert t[col][0].as_py() == expect  # bit-exact lerp


def test_cust_order_dist_zero_bucket(ray_session, tmp_path):
    from __ray_entry__ import _q_cust_order_dist

    rng = np.random.default_rng(3)
    custs = np.arange(1, 31, dtype=np.int64)
    pq.write_table(pa.table({
        "c_custkey": pa.array(custs),
        "c_name": pa.array([f"c{i}" for i in custs]),
        "c_nationkey": pa.array(np.zeros(len(custs), dtype=np.int32)),
        "c_acctbal": pa.array(np.zeros(len(custs))),
        "c_mktsegment": pa.array(["A"] * len(custs)),
    }), str(tmp_path / "customer.parquet"))
    n = 300
    ock = rng.integers(1, 21, size=n).astype(np.int64)  # custs 21..30: zero
    prio = np.where(rng.random(n) < 0.4, "1-URGENT", "5-LOW")
    pq.write_table(pa.table({
        "o_custkey": pa.array(ock),
        "o_orderpriority": pa.array(prio.astype(object)),
    }), str(tmp_path / "orders.parquet"))

    t = _to_table(_q_cust_order_dist(str(tmp_path)))
    got = dict(zip(t["n_urgent"].to_pylist(), t["n_cust"].to_pylist()))

    per = pd.Series(ock[prio == "1-URGENT"]).value_counts()
    full = per.reindex(custs, fill_value=0)
    expect = full.value_counts().to_dict()
    assert got == {int(k): int(v) for k, v in expect.items()}
    assert 0 in got  # zero bucket present by construction


def test_cust_no_urgent_brute(ray_session, tmp_path):
    from __ray_entry__ import _q_cust_no_urgent

    rng = np.random.default_rng(5)
    nc = 80
    custs = np.arange(1, nc + 1, dtype=np.int64)
    nat = rng.integers(0, 5, size=nc).astype(np.int32)
    bal = np.round(rng.uniform(-500, 5000, size=nc), 2)
    pq.write_table(pa.table({
        "c_custkey": pa.array(custs),
        "c_nationkey": pa.array(nat),
        "c_acctbal": pa.array(bal),
    }), str(tmp_path / "customer.parquet"))
    n = 400
    ock = rng.integers(1, nc + 1, size=n).astype(np.int64)
    prio = np.where(rng.random(n) < 0.25, "1-URGENT", "3-MEDIUM")
    pq.write_table(pa.table({
        "o_custkey": pa.array(ock),
        "o_orderpriority": pa.array(prio.astype(object)),
    }), str(tmp_path / "orders.parquet"))

    t = _to_table(_q_cust_no_urgent(str(tmp_path)))
    got = {r["c_nationkey"]: (r["n_cust"], r["total_bal_c"])
           for r in t.to_pylist()}

    cents = np.rint(bal * 100).astype(np.int64)
    pos = cents[cents > 0]
    tot, npos = pos.sum(), len(pos)
    urgent_custs = set(ock[prio == "1-URGENT"].tolist())
    expect = {}
    for ck, nk, c in zip(custs, nat, cents):
        if c * npos > tot and int(ck) not in urgent_custs:
            a, b = expect.get(int(nk), (0, 0))
            expect[int(nk)] = (a + 1, b + int(c))
    assert got == expect and len(expect) > 0


def test_q4_priority_brute(ray_session, tmp_path):
    from __ray_entry__ import _q_q4_priority

    rng = np.random.default_rng(9)
    no = 120
    okey = np.arange(1, no + 1, dtype=np.int64)
    odate = rng.integers(0, 10 * 86_400_000_000, size=no)
    prio = rng.choice(["1-URGENT", "2-HIGH", "3-MEDIUM"], size=no)
    pq.write_table(pa.table({
        "o_orderkey": pa.array(okey),
        "o_orderdate": _ts(odate),
        "o_orderpriority": pa.array(prio.astype(object)),
    }), str(tmp_path / "orders.parquet"))
    nl = 500
    lok = rng.integers(1, no + 1, size=nl).astype(np.int64)
    lsd = rng.integers(0, 10 * 86_400_000_000, size=nl)
    pq.write_table(pa.table({
        "l_orderkey": pa.array(lok),
        "l_shipdate": _ts(lsd),
    }), str(tmp_path / "lineitem.parquet"))

    t = _to_table(_q_q4_priority(str(tmp_path)))
    got = dict(zip(t["o_orderpriority"].to_pylist(),
                   t["n_orders"].to_pylist()))

    mx = pd.DataFrame({"k": lok, "s": lsd}).groupby("k")["s"].max()
    expect = {}
    for k, d, p in zip(okey, odate, prio):
        if k in mx.index and mx[k] > d:
            expect[p] = expect.get(p, 0) + 1
    assert got == expect


def test_promo_share_brute(ray_session, tmp_path):
    from __ray_entry__ import _q_promo_share

    rng = np.random.default_rng(13)
    npart = 40
    pkey = np.arange(1, npart + 1, dtype=np.int64)
    ptype = np.where(rng.random(npart) < 0.3, "PROMO", "STANDARD")
    pq.write_table(pa.table({
        "p_partkey": pa.array(pkey),
        "p_type": pa.array(ptype.astype(object)),
    }), str(tmp_path / "part.parquet"))
    n = 600
    lpk = rng.integers(1, npart + 1, size=n).astype(np.int64)
    ep = np.round(rng.uniform(100, 5000, size=n), 2)
    dc = np.round(rng.uniform(0, 0.1, size=n), 2)
    base = np.datetime64("1996-01-01T00:00:00", "us").astype(np.int64)
    # half in the window, half after it
    sd = base + rng.integers(0, 180 * 86_400_000_000, size=n)
    pq.write_table(pa.table({
        "l_partkey": pa.array(lpk),
        "l_extendedprice": pa.array(ep),
        "l_discount": pa.array(dc),
        "l_shipdate": pa.array(sd.view("datetime64[us]")),
    }), str(tmp_path / "lineitem.parquet"))

    t = _q_promo_share(str(tmp_path))

    hi = np.datetime64("1996-04-01T00:00:00", "us").astype(np.int64)
    in_win = sd < hi
    bp = np.floor(ep * (1.0 - dc) * 10000.0).astype(np.int64)
    promo = {int(k) for k, ty in zip(pkey, ptype) if ty == "PROMO"}
    is_promo = np.array([int(k) in promo for k in lpk])
    promo_bp = int(bp[in_win & is_promo].sum())
    total_bp = int(bp[in_win].sum())
    assert t["promo_bp"][0].as_py() == promo_bp
    assert t["total_bp"][0].as_py() == total_bp
    assert t["promo_share"][0].as_py() == float(promo_bp) / float(total_bp)


def test_bfs_hops4_brute(ray_session, tmp_path):
    from __ray_entry__ import _q_bfs_hops4

    rng = np.random.default_rng(17)
    eid = rng.integers(0, 200_000, size=2500).astype(np.int64)
    pq.write_table(pa.table({"event_id": pa.array(eid)}),
                   str(tmp_path / "events.parquet"))

    t = _to_table(_q_bfs_hops4(str(tmp_path)))
    got = dict(zip(t["node"].to_pylist(), t["hops"].to_pylist()))

    x = eid % 499
    y = (eid // 499 + eid % 491) % 499
    adj = {}
    for a, b in zip(x, y):
        if a != b:
            adj.setdefault(int(a), set()).add(int(b))
            adj.setdefault(int(b), set()).add(int(a))
    hops, frontier = {0: 0}, {0}
    for k in range(1, 5):
        frontier = {n for f in frontier for n in adj.get(f, ())
                    if n not in hops}
        for n in frontier:
            hops[n] = k
        if not frontier:
            break
    assert got == hops and len(got) > 1


def test_bfs_early_exhaustion(ray_session, tmp_path):
    """A 2-hop path graph exhausts the frontier before depth 4 — the
    empty-frontier break and the typed-empty broadcast side must hold."""
    from __ray_entry__ import _q_bfs_hops4

    # edges 0-1 and 1-2 only: event_id=499*b+a gives a % 499 = a,
    # (eid//499 + eid%491) % 499 edge derivation — craft via search
    eids = []
    want = [(0, 1), (1, 2)]
    e = 0
    while want and e < 5_000_000:
        a = e % 499
        b = (e // 499 + e % 491) % 499
        if (a, b) in want or (b, a) in want:
            pair = (a, b) if (a, b) in want else (b, a)
            want.remove(pair)
            eids.append(e)
        e += 1
    assert not want, "could not synthesize path edges"
    pq.write_table(pa.table({"event_id": pa.array(
        np.asarray(eids, dtype=np.int64))}),
        str(tmp_path / "events.parquet"))

    t = _to_table(_q_bfs_hops4(str(tmp_path)))
    got = dict(zip(t["node"].to_pylist(), t["hops"].to_pylist()))
    assert got == {0: 0, 1: 1, 2: 2}


def test_user_active_time_brute(ray_session, tmp_path):
    from __ray_entry__ import _q_user_active_time

    rng = np.random.default_rng(19)
    n = 2500
    user = rng.integers(0, 25, size=n).astype(np.int64)
    off = rng.integers(0, 2 * 86_400_000_000, size=n)
    pq.write_table(pa.table({
        "user_id": pa.array(user), "ts": _ts(off),
    }), str(tmp_path / "events.parquet"))

    t = _to_table(_q_user_active_time(str(tmp_path)))
    got = dict(zip(t["user_id"].to_pylist(), t["active_us"].to_pylist()))

    L = 900_000_000
    expect = {}
    df = pd.DataFrame({"u": user, "s": off}).sort_values(["u", "s"])
    for u, g in df.groupby("u"):
        s = g["s"].to_numpy()
        total, cs, ce = 0, s[0], s[0] + L
        for v in s[1:]:
            if v > ce:
                total += ce - cs
                cs, ce = v, v + L
            else:
                ce = v + L
        total += ce - cs
        expect[int(u)] = int(total)
    assert got == expect


def test_click_nobuy_days_brute(ray_session, tmp_path):
    from __ray_entry__ import _q_click_nobuy_days

    rng = np.random.default_rng(23)
    n = 3000
    user = rng.integers(0, 30, size=n).astype(np.int64)
    off = rng.integers(0, 20 * 86_400_000_000, size=n)
    et = rng.choice(["click", "purchase", "view"], size=n)
    pq.write_table(pa.table({
        "user_id": pa.array(user), "ts": _ts(off),
        "event_type": pa.array(et.astype(object)),
    }), str(tmp_path / "events.parquet"))

    t = _to_table(_q_click_nobuy_days(str(tmp_path)))
    got = set(zip(t["user_id"].to_pylist(), t["day"].to_pylist()))

    base = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)
    day = (base + off) // 86_400_000_000
    clicks = {(int(u), int(d)) for u, d, e in zip(user, day, et)
              if e == "click"}
    buys = {(int(u), int(d)) for u, d, e in zip(user, day, et)
            if e == "purchase"}
    assert got == clicks - buys and len(got) > 0


def test_distinct_users_hll_tolerance(ray_session, tmp_path):
    from __ray_entry__ import _q_distinct_users_hll

    rng = np.random.default_rng(29)
    user = rng.integers(0, 5000, size=40_000).astype(np.int64)
    pq.write_table(pa.table({"user_id": pa.array(user)}),
                   str(tmp_path / "events.parquet"))
    est = _q_distinct_users_hll(str(tmp_path))["n_users_hll"][0].as_py()
    exact = len(np.unique(user))
    assert abs(est - exact) / exact < 0.05


def test_calendar_fill_zero_days(ray_session, tmp_path):
    from __ray_entry__ import _q_calendar_fill

    rng = np.random.default_rng(31)
    n = 800
    off = rng.integers(0, 12 * 86_400_000_000, size=n)
    val = rng.uniform(0, 100, size=n)
    # plant exactly three rare events on days 2 and 9
    off[:3] = [2 * 86_400_000_000 + 5, 2 * 86_400_000_000 + 9,
               9 * 86_400_000_000 + 1]
    val[:3] = 500.0
    pq.write_table(pa.table({
        "ts": _ts(off), "value": pa.array(val),
        "user_id": pa.array(np.zeros(n, dtype=np.int64)),
    }), str(tmp_path / "events.parquet"))

    t = _q_calendar_fill(str(tmp_path))
    base_day = (np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)
                // 86_400_000_000)
    days = t["day"].to_numpy()
    counts = dict(zip((days - base_day).tolist(),
                      t["n_events"].to_pylist()))
    lo = int(off.min() // 86_400_000_000)
    hi = int(off.max() // 86_400_000_000)
    assert sorted(counts) == list(range(lo, hi + 1))  # dense spine
    assert counts[2] == 2 and counts[9] == 1
    assert sum(counts.values()) == 3  # every other day zero-filled


def test_locf_value_run_boundaries(ray_session, tmp_path):
    """The carry must NOT cross user boundaries: a user whose first
    events are all 'error' stays at -1 even when the lexsort places a
    valid row of ANOTHER user immediately before."""
    from __ray_entry__ import _q_locf_value

    rng = np.random.default_rng(37)
    n = 2000
    user = rng.integers(0, 20, size=n).astype(np.int64)
    off = rng.integers(0, 86_400_000_000, size=n)
    et = rng.choice(["error", "click"], size=n, p=[0.4, 0.6])
    # user 19: errors only → every filled_value must be -1
    et = np.where(user == 19, "error", et)
    val = np.round(rng.uniform(0, 10, size=n), 3)
    eid = np.arange(n, dtype=np.int64)
    pq.write_table(pa.table({
        "event_id": pa.array(eid), "user_id": pa.array(user),
        "ts": _ts(off), "event_type": pa.array(et.astype(object)),
        "value": pa.array(val),
    }), str(tmp_path / "events.parquet"))

    t = _to_table(_q_locf_value(str(tmp_path)))
    got = dict(zip(t["event_id"].to_pylist(),
                   t["filled_value"].to_pylist()))

    df = pd.DataFrame({"e": eid, "u": user, "ts": off, "et": et,
                       "v": val}).sort_values(["u", "ts", "e"])
    expect = {}
    for _, g in df.groupby("u"):
        last = -1.0
        for _, r in g.iterrows():
            if r["et"] != "error":
                last = r["v"]
            expect[int(r["e"])] = last
    assert got == expect
    assert all(got[int(e)] == -1.0 for e in eid[user == 19])


def test_train_val_split_deterministic(ray_session, tmp_path):
    from __ray_entry__ import _q_train_val_split
    import hashlib

    ids = np.arange(1, 4001, dtype=np.int64)
    nch = np.full(len(ids), 7, dtype=np.int64)
    pq.write_table(pa.table({
        "doc_id": pa.array(ids), "text": pa.array(["x"] * len(ids)),
        "lang": pa.array(["en"] * len(ids)),
        "source": pa.array(["s"] * len(ids)),
        "n_chars": pa.array(nch),
    }), str(tmp_path / "documents.parquet"))

    t = _to_table(_q_train_val_split(str(tmp_path)))
    got = {r["split"]: (r["n_docs"], r["total_chars"])
           for r in t.to_pylist()}

    expect = {}
    for i in ids:
        h = hashlib.md5(str(int(i)).encode()).hexdigest()[:2]
        s = "train" if h < "cc" else ("val" if h < "e6" else "test")
        a, b = expect.get(s, (0, 0))
        expect[s] = (a + 1, b + 7)
    assert got == expect
    # rough ratios hold (204/26/26 out of 256)
    assert abs(got["train"][0] / len(ids) - 204 / 256) < 0.03


def test_csv_roundtrip_exact(ray_session, tmp_path):
    from __ray_entry__ import _q_csv_roundtrip

    rng = np.random.default_rng(41)
    n = 5000
    flag = rng.choice(["A", "N", "R"], size=n)
    qty = rng.uniform(0.4, 50.6, size=n)
    pq.write_table(pa.table({
        "l_returnflag": pa.array(flag.astype(object)),
        "l_quantity": pa.array(qty),
    }), str(tmp_path / "lineitem.parquet"))

    t = _to_table(_q_csv_roundtrip(str(tmp_path)))
    got = dict(zip(t["l_returnflag"].to_pylist(),
                   t["sum_qty"].to_pylist()))
    q = np.rint(qty).astype(np.int64)
    expect = {f: int(q[flag == f].sum()) for f in ["A", "N", "R"]}
    assert got == expect


def test_open_orders_daily_brute(ray_session, tmp_path):
    from __ray_entry__ import _q_open_orders_daily

    rng = np.random.default_rng(43)
    n = 400
    sd = rng.integers(0, 90, size=n)  # start days
    pq.write_table(pa.table({
        "o_orderdate": _ts(sd * 86_400_000_000),
    }), str(tmp_path / "orders.parquet"))

    t = _q_open_orders_daily(str(tmp_path))
    base = (np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)
            // 86_400_000_000)
    got = dict(zip((t["day"].to_numpy() - base).tolist(),
                   t["n_open"].to_pylist()))

    lo, hi = int(sd.min()), int(sd.max()) + 30
    expect = {d: int(((sd <= d) & (d < sd + 30)).sum())
              for d in range(lo, hi)}
    assert got == expect
    assert min(expect.values()) >= 0 and max(got.values()) > 1


def test_feature_hash_counts_brute(ray_session, tmp_path):
    import hashlib

    from __ray_entry__ import _q_feature_hash_counts

    rng = np.random.default_rng(47)
    vocab = ["alpha", "beta", "gamma", "", "x y", "delta9"]
    texts = [" ".join(rng.choice(vocab[:4], size=rng.integers(1, 12)))
             for _ in range(400)]
    texts.append("")          # empty doc → one empty token
    texts.append("a  b")      # double space → empty middle token
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * len(texts)),
        "source": pa.array(["s"] * len(texts)),
        "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
    }), str(tmp_path / "documents.parquet"))

    t = _to_table(_q_feature_hash_counts(str(tmp_path)))
    got = dict(zip(t["bucket"].to_pylist(), t["n_tokens"].to_pylist()))

    expect = {}
    for txt in texts:
        for w in txt.split(" "):
            b = hashlib.md5(w.encode()).hexdigest()[:2]
            expect[b] = expect.get(b, 0) + 1
    assert got == expect


def test_ann_range_brute(ray_session, tmp_path):
    from __ray_entry__ import _q_ann_range

    rng = np.random.default_rng(53)
    n, dim = 300, 16
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    pq.write_table(pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(list(vecs),
                              type=pa.list_(pa.float32())),
        "label": pa.array(np.zeros(n, dtype=np.int32)),
    }), str(tmp_path / "embeddings.parquet"))

    t = _to_table(_q_ann_range(str(tmp_path)))
    got = set(zip(t["qid"].to_pylist(), t["vec_id"].to_pylist()))

    v = vecs.astype(np.float64)
    u = v / np.linalg.norm(v, axis=1)[:, None]
    sims = u[:8] @ u.T
    expect = {(q, i) for q in range(8) for i in range(n)
              if q != i and np.round(sims[q, i], 6) >= 0.3}
    assert got == expect and len(got) > 0
    assert all(q != i for q, i in got)  # self-pairs excluded


def test_nearest_poly_ties_and_containment(ray_session):
    """Points inside overlapping boxes must pick the LOWEST poly_id at
    d2=0; outside points get the exact clamp distance."""
    import numpy as np

    from __ray_entry__ import _q_nearest_poly
    from engine.rayds.imagetab import image_dataset, load_layer

    sf = "/root/testdata/sf0.001"
    t = pa.concat_tables([b for b in _q_nearest_poly(sf).iter_batches(
        batch_format="pyarrow")])
    layer = load_layer(sf)
    imgs = pa.concat_tables([b for b in image_dataset(sf).iter_batches(
        batch_format="pyarrow")])
    x = imgs["x"].to_numpy(zero_copy_only=False)
    y = imgs["y"].to_numpy(zero_copy_only=False)
    order = np.argsort(layer.poly_ids, kind="stable")
    ids, b = layer.poly_ids[order], layer.bounds[order]
    dx = np.maximum(np.maximum(b[None, :, 0] - x[:, None],
                               x[:, None] - b[None, :, 2]), 0.0)
    dy = np.maximum(np.maximum(b[None, :, 1] - y[:, None],
                               y[:, None] - b[None, :, 3]), 0.0)
    d2 = dx * dx + dy * dy
    j = np.argmin(d2, axis=1)
    got = dict(zip(t["image_id"].to_pylist(),
                   zip(t["poly_id"].to_pylist(), t["d2"].to_pylist())))
    expect = dict(zip(imgs["image_id"].to_pylist(),
                      zip(ids[j].tolist(),
                          d2[np.arange(len(x)), j].tolist())))
    assert got == expect
    # the fixture layer overlaps: some point sits in >1 box (d2 == 0
    # with a tie) and must resolve to the lowest id
    inside_multi = (d2 == 0).sum(axis=1) > 1
    assert inside_multi.any()
    for i in np.nonzero(inside_multi)[0][:5]:
        iid = imgs["image_id"][int(i)].as_py()
        assert got[iid][0] == int(ids[np.nonzero(d2[i] == 0)[0][0]])


def test_grouped_mrl_quantiles_rank_bounds(ray_session):
    """Per-group sketch quantiles must respect the self-certified ±err
    rank bound for every group, including a tiny group (exact)."""
    import ray.data

    from engine.ops.sketch import grouped_mrl_quantiles

    rng = np.random.default_rng(59)
    n = 80_000
    g = rng.choice(["x", "y", "z"], size=n, p=[0.6, 0.39, 0.01])
    v = rng.lognormal(0, 1.5, size=n)
    ds = ray.data.from_arrow(pa.table({"g": g, "v": v})).repartition(12)
    t = pa.concat_tables([b for b in grouped_mrl_quantiles(
        ds, "g", "v", [0.5, 0.9]).iter_batches(batch_format="pyarrow")])
    assert sorted(t["g"].to_pylist()) == ["x", "y", "z"]
    for r in t.to_pylist():
        sub = np.sort(v[g == r["g"]])
        assert r["n"] == len(sub)
        for q, c in [(0.5, "q50"), (0.9, "q90")]:
            rank = np.searchsorted(sub, r[c], side="left")
            assert abs(rank - q * len(sub)) <= r["err"] + 1
    # the small group's certified err must be far tighter than the big
    # groups' (fewer compactions) — the bound is group-local, not global
    errs = {r["g"]: r["err"] for r in t.to_pylist()}
    assert errs["z"] < errs["x"]


def test_mkt_share_plans_agree(ray_session):
    """The zero-exchange broadcast plan and the general three-equi-join
    plan must produce identical market-share tables."""
    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    a = e._mkt_share_broadcast_plan(sf).to_pandas().sort_values(
        "o_year", ignore_index=True)
    b = e._mkt_share_join_plan(sf).to_pandas().sort_values(
        "o_year", ignore_index=True)
    assert a.equals(b) and len(a) > 0
