"""Tests for engine/ops/stats.py (exact corr, grouped mode, latest-by-
key), engine/ops/kth.py (exact order statistic), and
engine/ops/contam.py (exact n-gram contamination screen)."""

import numpy as np
import pyarrow as pa
import pytest


# ------------------------------------------------------------- exact corr
def test_exact_moments_match_python_ints(ray_session):
    import ray.data

    from engine.ops.stats import exact_moments, pearson_from_moments

    rng = np.random.default_rng(3)
    # large magnitudes to stress the chunked int64 accumulation
    x = rng.integers(-50, 50, size=30_011)
    y = rng.integers(-10**7, 10**7, size=30_011)
    ds = ray.data.from_arrow(
        pa.table({"x": pa.array(x.astype(np.float64)),
                  "y": pa.array(y.astype(np.float64))})
    ).repartition(9)
    m = exact_moments(ds, "x", "y")
    xs, ys = [int(v) for v in x], [int(v) for v in y]
    assert m["n"] == len(xs)
    assert m["sx"] == sum(xs) and m["sy"] == sum(ys)
    assert m["sxx"] == sum(v * v for v in xs)
    assert m["syy"] == sum(v * v for v in ys)
    assert m["sxy"] == sum(a * b for a, b in zip(xs, ys))
    r = pearson_from_moments(m)
    expect = np.corrcoef(x.astype(float), y.astype(float))[0, 1]
    assert abs(r - expect) < 1e-9


def test_exact_corr_perfect_and_degenerate(ray_session):
    import ray.data

    from engine.ops.stats import exact_corr

    x = np.arange(1000, dtype=np.float64)
    ds = ray.data.from_arrow(pa.table({"x": x, "y": 3 * x + 7})).repartition(4)
    t = exact_corr(ds, "x", "y")
    assert t["n"][0].as_py() == 1000
    assert t["corr"][0].as_py() == pytest.approx(1.0, abs=1e-12)
    # zero variance → NaN, no crash
    ds2 = ray.data.from_arrow(
        pa.table({"x": x, "y": np.full(1000, 5.0)})).repartition(4)
    assert np.isnan(exact_corr(ds2, "x", "y")["corr"][0].as_py())


def test_moment_partial_scale_exactness():
    """Cents-scaled doubles recover exact integer moments."""
    from engine.ops.stats import _moment_partial

    y = np.array([12345.67, 0.01, 99999.99])
    t = pa.table({"x": pa.array([1.0, 2.0, 3.0]), "y": pa.array(y)})
    p = _moment_partial("x", "y", 1, 100)(t)
    assert int(p["sy"][0].as_py()) == 1234567 + 1 + 9999999
    assert int(p["syy"][0].as_py()) == (
        1234567**2 + 1 + 9999999**2)


# ------------------------------------------------------------ kth smallest
def test_kth_smallest_matches_sort(ray_session):
    import ray.data

    from engine.ops.kth import kth_smallest

    rng = np.random.default_rng(5)
    v = np.concatenate([
        rng.normal(0, 1, 20_000),
        rng.normal(0, 1e-6, 5_000),       # dense cluster → refinement
        np.array([-np.inf, np.inf, -0.0, 0.0]),
        rng.uniform(-1e9, 1e9, 5_000),
    ])
    ds = ray.data.from_arrow(pa.table({"v": v})).repartition(11)
    s = np.sort(v)
    for k in (1, 2, 17, len(v) // 2, len(v) - 1, len(v)):
        got = kth_smallest(ds, "v", k=k)
        assert got == float(s[k - 1]), k


def test_kth_smallest_budget_forces_rounds(ray_session):
    """A tiny budget forces multi-round refinement; values engineered to
    share top-16 bits so round 1 CANNOT separate them."""
    import ray.data

    from engine.ops.kth import kth_smallest

    rng = np.random.default_rng(6)
    # all values in [1.0, 1.0 + 2^-20): identical exponent + top mantissa
    v = 1.0 + rng.integers(0, 2**30, size=50_000) * 2.0**-52
    ds = ray.data.from_arrow(pa.table({"v": v})).repartition(7)
    s = np.sort(v)
    k = 25_000
    assert kth_smallest(ds, "v", k=k, budget=100) == float(s[k - 1])


def test_quantiles_cont_bit_exact(ray_session):
    """quantiles_cont == DuckDB quantile_cont to the BIT, including the
    shared-wave multi-rank path and a forced-refinement tiny budget."""
    import duckdb
    import ray.data

    from engine.ops.kth import quantiles_cont

    rng = np.random.default_rng(13)
    v = np.concatenate([rng.lognormal(0, 2, 20_000),
                        1.0 + rng.integers(0, 2**30, 20_000) * 2.0**-52])
    ds = ray.data.from_arrow(pa.table({"v": v})).repartition(9)
    con = duckdb.connect()
    con.register("t", pa.table({"v": v}))
    qs = [0.01, 0.25, 0.5, 0.75, 0.99]
    want = con.execute(
        "SELECT " + ", ".join(f"quantile_cont(v, {q})" for q in qs)
        + " FROM t").fetchone()
    for budget in (200_000, 50):
        got = quantiles_cont(ds, "v", qs, budget=budget)
        assert [g.hex() for g in got] == [w.hex() for w in want], budget


def test_kth_quantile_disc_parity(ray_session):
    """k=None, q → exactly DuckDB quantile_disc."""
    import duckdb
    import ray.data

    from engine.ops.kth import kth_smallest

    rng = np.random.default_rng(7)
    v = np.round(rng.lognormal(0, 2, 9_999), 3)
    ds = ray.data.from_arrow(pa.table({"v": v})).repartition(5)
    con = duckdb.connect()
    con.register("t", pa.table({"v": v}))
    for q in (0.5, 0.9, 0.01):
        want = con.execute(
            f"SELECT quantile_disc(v, {q}) FROM t").fetchone()[0]
        assert kth_smallest(ds, "v", q=q) == want, q


# ------------------------------------------------------------ grouped mode
def test_grouped_mode_matches_brute(ray_session):
    import ray.data

    from engine.ops.stats import grouped_mode

    rng = np.random.default_rng(8)
    n = 40_000
    keys = rng.integers(0, 23, size=n)
    vals = rng.integers(0, 50, size=n)
    ds = ray.data.from_arrow(
        pa.table({"k": keys, "v": vals})).repartition(13)
    out = {r["key"]: (r["mode"], r["n"])
           for r in grouped_mode(ds, "k", "v").take_all()}
    for k in np.unique(keys):
        vv = vals[keys == k]
        us, cs = np.unique(vv, return_counts=True)
        best = np.lexsort((us, -cs))[0]
        assert out[int(k)] == (int(us[best]), int(cs[best])), k


def test_grouped_mode_string_key_tiebreak(ray_session):
    import ray.data

    from engine.ops.stats import grouped_mode

    t = pa.table({
        "k": pa.array(["a", "a", "a", "a", "b", "b"]),
        "v": pa.array([9, 9, 2, 2, 5, 5]),
    })
    out = {r["key"]: (r["mode"], r["n"]) for r in
           grouped_mode(ray.data.from_arrow(t).repartition(3),
                        "k", "v").take_all()}
    # tie 9↔2 at count 2 → smallest value wins
    assert out == {"a": (2, 2), "b": (5, 2)}


# --------------------------------------------------------- latest-per-key
def test_latest_by_key_matches_brute(ray_session):
    import ray.data

    from engine.ops.stats import latest_by_key

    rng = np.random.default_rng(9)
    n = 30_000
    t = pa.table({
        "k": rng.integers(0, 500, size=n),
        "ts": rng.integers(0, 1000, size=n),   # many ties → 2nd order col
        "uid": np.arange(n, dtype=np.int64),
        "payload": rng.normal(size=n),
    })
    ds = ray.data.from_arrow(t).repartition(12)
    got = {r["k"]: (r["ts"], r["uid"], r["payload"])
           for r in latest_by_key(ds, "k", ["ts", "uid"],
                                  ["payload"]).take_all()}
    k = t["k"].to_numpy()
    ts = t["ts"].to_numpy()
    uid = t["uid"].to_numpy()
    pay = t["payload"].to_numpy()
    order = np.lexsort((uid, ts, k))
    last = order[np.nonzero(np.diff(np.append(k[order], -1)))[0]]
    want = {int(k[i]): (int(ts[i]), int(uid[i]), float(pay[i]))
            for i in last}
    assert got == want
    assert len(got) == len(np.unique(k))


# --------------------------------------------------------------- skyline
def _brute_skyline(mx, mn):
    keep = []
    for i in range(len(mx)):
        dom = False
        for j in range(len(mx)):
            if (mx[j] >= mx[i] and mn[j] <= mn[i]
                    and (mx[j] > mx[i] or mn[j] < mn[i])):
                dom = True
                break
        keep.append(not dom)
    return np.asarray(keep)


def test_skyline_matches_brute_with_ties(ray_session):
    import ray.data

    from engine.ops.skyline import skyline

    rng = np.random.default_rng(14)
    n = 3000
    # coarse grids → plenty of exact ties; plant a duplicated frontier
    # point (both copies must survive: neither dominates the other)
    mx = rng.integers(0, 40, n).astype(np.float64)
    mn = rng.integers(0, 40, n)
    best = np.argmax(mx - 1e-3 * mn)
    mx[0], mn[0] = mx[best], mn[best]
    t = pa.table({"id": np.arange(n, dtype=np.int64), "mx": mx, "mn": mn})
    ds = ray.data.from_arrow(t).repartition(11)
    got = sorted(r["id"] for r in skyline(
        ds, "mx", "mn", ["id", "mx", "mn"]).take_all())
    want = sorted(np.nonzero(_brute_skyline(mx, mn))[0].tolist())
    assert got == want
    assert len(got) >= 2  # the planted duplicate pair is present


def test_frontier_mask_all_on_frontier():
    from engine.ops.skyline import _frontier_mask

    # strictly decreasing trade-off: every point non-dominated
    mx = np.arange(50, dtype=np.float64)
    mn = np.arange(50, dtype=np.int64)
    assert _frontier_mask(mx, mn).all()
    # one point dominates everything
    mx2 = np.r_[mx, 100.0]
    mn2 = np.r_[mn, -1]
    m = _frontier_mask(mx2, mn2)
    assert m[-1] and m[:-1].sum() == 0


# -------------------------------------------------------------- crosstab
def test_crosstab_residuals_matches_manual(ray_session):
    import ray.data

    from engine.ops.stats import crosstab_residuals

    rng = np.random.default_rng(15)
    n = 20_000
    r = rng.integers(0, 5, n)
    c = rng.integers(0, 7, n)
    ds = ray.data.from_arrow(pa.table({"r": r, "c": c})).repartition(8)
    rows = crosstab_residuals(ds, "r", "c").take_all()
    assert len(rows) == len(set(zip(r.tolist(), c.tolist())))
    import collections

    o = collections.Counter(zip(r.tolist(), c.tolist()))
    rt = collections.Counter(r.tolist())
    ct = collections.Counter(c.tolist())
    for row in rows:
        key = (row["r"], row["c"])
        assert row["o"] == o[key]
        e = float(rt[key[0]]) * ct[key[1]] / n
        assert row["expected"] == e
        assert row["resid"] == (o[key] - e) / np.sqrt(e)


# ----------------------------------------------------------- contamination
def _brute_ngrams(t: str, n: int):
    ws = t.split(" ")
    return {" ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)}


def test_doc_ngram_bytes_matches_brute():
    from engine.ops.contam import _doc_ngram_bytes

    rng = np.random.default_rng(10)
    vocab = ["alpha", "b", "cc", "dd-dd", "e9", "ff", "g"]
    docs = [" ".join(vocab[i] for i in rng.integers(0, len(vocab),
                                                    size=rng.integers(0, 15)))
            for _ in range(300)]
    for n in (2, 3, 5):
        grams, didx = _doc_ngram_bytes(pa.array(docs), n)
        got = {}
        for g, d in zip(grams.tolist(), didx.tolist()):
            got.setdefault(d, []).append(g.decode())
        for d, t in enumerate(docs):
            ws = t.split(" ")
            want = [" ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)]
            assert got.get(d, []) == want, (n, d, t)


def test_contamination_screen_matches_brute(ray_session):
    import ray
    import ray.data

    from engine.ops.contam import benchmark_ngram_set, contamination_screen

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(12)]

    def mk(n):
        return " ".join(vocab[i] for i in rng.integers(0, 12, size=n))

    bench_docs = [mk(30) for _ in range(5)]
    corpus = [mk(40) for _ in range(120)]
    # plant a true contamination: doc 7 embeds a benchmark span
    corpus[7] = corpus[7] + " " + " ".join(bench_docs[0].split(" ")[3:11])
    N = 5
    bench_set = set()
    for b in bench_docs:
        bench_set |= _brute_ngrams(b, N)
    want = {}
    for i, c in enumerate(corpus):
        hits = _brute_ngrams(c, N) & bench_set
        if hits:
            want[1000 + i] = len(hits)
    assert 1007 in want  # the plant is detected by brute force

    bds = ray.data.from_arrow(
        pa.table({"text": pa.array(bench_docs)})).repartition(2)
    grams = benchmark_ngram_set(bds, n=N)
    cds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(1000, 1000 + len(corpus))),
        "text": pa.array(corpus),
    })).repartition(6)
    got = {r["doc_id"]: r["n_hits"] for r in
           contamination_screen(cds, ray.put(grams), n=N).take_all()}
    assert got == want


def test_benchmark_ngram_budget(ray_session):
    import ray.data

    from engine.ops.contam import benchmark_ngram_set

    docs = [" ".join(f"u{i}x{j}" for j in range(40)) for i in range(20)]
    ds = ray.data.from_arrow(pa.table({"text": pa.array(docs)}))
    with pytest.raises(ValueError):
        benchmark_ngram_set(ds, budget=10)


# ------------------------------------------------- grouped quantile_cont
def test_grouped_quantiles_cont_bit_exact(ray_session):
    import ray.data

    from engine.ops.sketch import grouped_quantiles_cont

    rng = np.random.default_rng(21)
    n = 30_000
    g = rng.integers(0, 6, n)
    # heavy exact ties (coarse grid) + a continuous tail
    v = np.where(rng.random(n) < 0.5,
                 rng.integers(0, 20, n).astype(np.float64),
                 rng.lognormal(0, 1, n))
    ds = ray.data.from_arrow(
        pa.table({"g": g.astype(np.int64), "v": v})).repartition(7)
    qs = (0.25, 0.5, 0.9)
    got = {(r["g"], r["q"]): r["v"]
           for r in grouped_quantiles_cont(ds, "g", "v", qs).take_all()}
    for gi in np.unique(g):
        vals = np.sort(v[g == gi])
        for q in qs:
            h = (len(vals) - 1) * q
            lo, hi = int(np.floor(h)), int(np.ceil(h))
            frac = h - lo
            want = vals[lo] * (1 - frac) + vals[hi] * frac
            assert got[(int(gi), q)] == want  # bit-exact


# ------------------------------------------------------------- trajectory
def test_trajectory_stats_matches_brute(ray_session):
    import ray.data

    from engine.ops.trajectory import trajectory_stats

    rng = np.random.default_rng(33)
    n = 8000
    k = rng.integers(0, 40, n).astype(np.int64)
    ts = rng.integers(0, 500, n).astype(np.int64)  # heavy ts ties
    eid = rng.permutation(n).astype(np.int64)
    ix = rng.integers(0, 1000, n).astype(np.int64)
    iy = rng.integers(0, 1000, n).astype(np.int64)
    ds = ray.data.from_arrow(pa.table(
        {"k": k, "ts": ts, "eid": eid, "ix": ix, "iy": iy})).repartition(7)
    got = {r["k"]: (r["n_points"], r["path_d2"], r["net_d2"])
           for r in trajectory_stats(ds, "k", ["ts", "eid"],
                                     "ix", "iy").take_all()}
    for kk in np.unique(k):
        m = k == kk
        order = np.lexsort((eid[m], ts[m]))
        xs, ys = ix[m][order], iy[m][order]
        path = int(((np.diff(xs) ** 2) + (np.diff(ys) ** 2)).sum())
        net = int((xs[-1] - xs[0]) ** 2 + (ys[-1] - ys[0]) ** 2)
        assert got[int(kk)] == (int(m.sum()), path, net)


def test_trajectory_single_point_entities(ray_session):
    import ray.data

    from engine.ops.trajectory import trajectory_stats

    t = pa.table({"k": [1, 2, 3], "o": [5, 5, 5],
                  "ix": [10, 20, 30], "iy": [1, 2, 3]})
    got = {r["k"]: (r["n_points"], r["path_d2"], r["net_d2"])
           for r in trajectory_stats(ray.data.from_arrow(t), "k", ["o"],
                                     "ix", "iy").take_all()}
    assert got == {1: (1, 0, 0), 2: (1, 0, 0), 3: (1, 0, 0)}


# ---------------------------------------------------------------- rolling


def test_rolling_sum_matches_brute(ray_session):
    import ray.data

    from engine.ops.window import rolling_sum

    rng = np.random.default_rng(11)
    n = 4000
    k = rng.integers(0, 25, n).astype(np.int64)
    ts = rng.integers(0, 300, n).astype(np.int64)  # heavy ts ties
    eid = rng.permutation(n).astype(np.int64)
    v = rng.integers(-500, 500, n).astype(np.int64)
    ds = ray.data.from_arrow(pa.table(
        {"k": k, "ts": ts, "eid": eid, "v": v})).repartition(9)
    out = rolling_sum(ds, "k", ["ts", "eid"], "v", preceding=3,
                      id_col="eid").take_all()
    got = {r["eid"]: (r["roll_sum"], r["roll_n"], r["roll_avg"])
           for r in out}
    assert len(got) == n
    for kk in np.unique(k):
        m = k == kk
        order = np.lexsort((eid[m], ts[m]))
        vv, ee = v[m][order], eid[m][order]
        for i in range(len(vv)):
            lo = max(0, i - 3)
            s = int(vv[lo:i + 1].sum())
            cnt = i + 1 - lo
            assert got[int(ee[i])] == (s, cnt, s / cnt)


def test_rolling_sum_single_row_keys(ray_session):
    import ray.data

    from engine.ops.window import rolling_sum

    t = pa.table({"k": [1, 2], "o": [0, 0], "v": [7, -3],
                  "id": [10, 11]})
    out = {r["id"]: (r["roll_sum"], r["roll_n"], r["roll_avg"])
           for r in rolling_sum(ray.data.from_arrow(t), "k", ["o"], "v",
                                preceding=3, id_col="id").take_all()}
    assert out == {10: (7, 1, 7.0), 11: (-3, 1, -3.0)}


def test_grouped_string_agg_matches_brute(ray_session):
    import ray.data

    from engine.ops.window import grouped_string_agg

    rng = np.random.default_rng(5)
    n = 3000
    k = rng.integers(0, 20, n).astype(np.int64)
    ts = rng.integers(0, 100, n).astype(np.int64)
    eid = rng.permutation(n).astype(np.int64)
    words = np.asarray(["a", "bb", "ccc", ""], dtype=object)[
        rng.integers(0, 4, n)]
    ds = ray.data.from_arrow(pa.table(
        {"k": k, "ts": ts, "eid": eid,
         "w": pa.array(words.tolist(), type=pa.string())})).repartition(8)
    got = {r["k"]: r["agg"]
           for r in grouped_string_agg(ds, "k", ["ts", "eid"],
                                       "w", sep=",").take_all()}
    for kk in np.unique(k):
        m = k == kk
        order = np.lexsort((eid[m], ts[m]))
        assert got[int(kk)] == ",".join(words[m][order])


# ---------------------------------------------------------------- triangles


def test_triangle_count_matches_brute(ray_session):
    import itertools

    import ray.data

    from engine.ops.graph import triangle_count

    rng = np.random.default_rng(3)
    nv = 40
    a = rng.integers(0, nv, 600).astype(np.int64)
    b = rng.integers(0, nv, 600).astype(np.int64)
    # include self-loops + duplicate/reversed edges: the op must
    # canonicalize and dedup them
    ds = ray.data.from_arrow(pa.table({"a": a, "b": b})).repartition(6)
    got = triangle_count(ds).take_all()[0]["n_triangles"]
    edges = {(min(x, y), max(x, y)) for x, y in zip(a, b) if x != y}
    adj = {v: set() for v in range(nv)}
    for x, y in edges:
        adj[x].add(y)
        adj[y].add(x)
    brute = sum(1 for x, y, z in itertools.combinations(range(nv), 3)
                if y in adj[x] and z in adj[x] and z in adj[y])
    assert got == brute > 0


def test_triangle_count_empty_and_acyclic(ray_session):
    import ray.data

    from engine.ops.graph import triangle_count

    # a path graph has no triangles
    t = pa.table({"a": np.arange(50, dtype=np.int64),
                  "b": np.arange(1, 51, dtype=np.int64)})
    assert triangle_count(
        ray.data.from_arrow(t)).take_all()[0]["n_triangles"] == 0


def test_grouped_ntile_matches_brute(ray_session):
    import ray.data

    from engine.ops.window import grouped_ntile

    rng = np.random.default_rng(8)
    n = 3000
    k = rng.integers(0, 13, n).astype(np.int64)  # sizes not divisible by 4
    v = rng.integers(0, 50, n).astype(np.int64)  # heavy value ties
    eid = rng.permutation(n).astype(np.int64)
    ds = ray.data.from_arrow(pa.table(
        {"k": k, "v": v, "eid": eid})).repartition(7)
    got = {r["eid"]: r["bucket"]
           for r in grouped_ntile(ds, "k", ["v", "eid"], 4,
                                  id_col="eid").take_all()}
    assert len(got) == n
    for kk in np.unique(k):
        m = k == kk
        order = np.lexsort((eid[m], v[m]))
        ids = eid[m][order]
        nn = len(ids)
        q, r = divmod(nn, 4)
        sizes = [q + 1] * r + [q] * (4 - r)
        want = np.repeat(np.arange(1, 5), sizes)
        for i, e in enumerate(ids):
            assert got[int(e)] == want[i]


def test_grouped_rank_matches_brute(ray_session):
    import ray.data

    from engine.ops.window import grouped_rank

    rng = np.random.default_rng(11)
    n = 4000
    k = rng.integers(0, 17, n).astype(np.int64)
    v = rng.integers(0, 6, n).astype(np.float64)  # heavy ties
    rid = np.arange(n, dtype=np.int64)
    ds = ray.data.from_arrow(pa.table(
        {"k": k, "v": v, "rid": rid})).repartition(9)
    got = {r["rid"]: (r["rnk"], r["drnk"], r["prnk"])
           for r in grouped_rank(ds, "k", "v", ["rid"]).take_all()}
    assert len(got) == n
    for kk in np.unique(k):
        m = np.nonzero(k == kk)[0]
        vals = v[m]
        nn = len(m)
        for i, ridx in enumerate(m):
            rnk = int((vals < vals[i]).sum()) + 1
            drnk = int(len(np.unique(vals[vals < vals[i]]))) + 1
            prnk = 0.0 if nn == 1 else (rnk - 1) / (nn - 1)
            assert got[int(ridx)] == (rnk, drnk, prnk)


def _lev(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    d = list(range(lb + 1))
    for i in range(1, la + 1):
        prev, d[0] = d[0], i
        for j in range(1, lb + 1):
            cur = d[j]
            d[j] = min(d[j] + 1, d[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
            prev = cur
    return d[lb]


def test_fuzzy_pairs_matches_brute(ray_session):
    """fuzzy_pairs == brute-force all-pairs levenshtein<=1 (exact recall
    AND precision), on a corpus with planted sub/ins/del mutations,
    empty strings, and an identical-string clique."""
    import itertools

    import ray.data

    from engine.ops.fuzzy import fuzzy_pairs

    rng = np.random.default_rng(21)
    strs = []
    for _ in range(250):
        s = "".join(rng.choice(list("abcd"), rng.integers(0, 12)))
        strs.append(s)
        if rng.random() < 0.5 and s:  # planted near-dups
            p = int(rng.integers(0, len(s)))
            op = rng.integers(0, 3)
            if op == 0:
                strs.append(s[:p] + str(rng.integers(0, 9)) + s[p + 1:])
            elif op == 1:
                strs.append(s[:p] + s[p + 1:])
            else:
                strs.append(s[:p] + "x" + s[p:])
    strs += ["dupdup"] * 6 + ["", ""]  # clique + empty pair
    ids = np.arange(len(strs), dtype=np.int64)
    ds = ray.data.from_arrow(pa.table(
        {"i": ids, "s": pa.array(strs)})).repartition(7)
    got = {(r["a"], r["b"]): r["editdist"]
           for r in fuzzy_pairs(ds, "i", "s").take_all()}
    want = {}
    for i, j in itertools.combinations(range(len(strs)), 2):
        d = _lev(strs[i], strs[j])
        if d <= 1:
            want[(i, j)] = d
    assert got == want
    assert any(d == 0 for d in want.values())
    assert any(d == 1 for d in want.values())


def test_pagerank_matches_single_process(ray_session):
    """BSP pagerank == single-process numpy reference (same formula:
    uniform dangling redistribution, fixed damping/iters), on a random
    directed graph with dangling nodes, to 1e-12."""
    import ray.data

    from engine.ops.graph import pagerank

    rng = np.random.default_rng(5)
    n_edges, n_nodes = 4000, 300
    src = rng.integers(0, n_nodes, n_edges).astype(np.int64)
    dst = rng.integers(0, n_nodes + 40, n_edges).astype(np.int64)
    # nodes 300..339 appear only as dst → dangling
    ds = ray.data.from_arrow(pa.table(
        {"src": src, "dst": dst})).repartition(6)
    got = {r["node"]: r["pr"]
           for r in pagerank(ds, damping=0.85, iters=15).take_all()}

    nodes = np.unique(np.concatenate([src, dst]))
    idx = {int(v): i for i, v in enumerate(nodes)}
    m = len(nodes)
    si = np.array([idx[int(v)] for v in src])
    di = np.array([idx[int(v)] for v in dst])
    deg = np.zeros(m, np.int64)
    np.add.at(deg, si, 1)
    pr = np.full(m, 1.0 / m)
    for _ in range(15):
        w = np.divide(pr, deg, out=np.zeros_like(pr), where=deg > 0)
        acc = np.zeros(m)
        np.add.at(acc, di, w[si])
        dang = pr[deg == 0].sum()
        pr = (1 - 0.85) / m + 0.85 * (acc + dang / m)
    assert len(got) == m
    assert abs(sum(got.values()) - 1.0) < 1e-9  # mass conservation
    for i, v in enumerate(nodes):
        assert abs(got[int(v)] - pr[i]) < 1e-12

    # empty edge list → empty result
    e = ray.data.from_arrow(pa.table({
        "src": pa.array([], type=pa.int64()),
        "dst": pa.array([], type=pa.int64())}))
    assert pagerank(e).count() == 0


# -------------------------------------------------- RANGE-frame window
def test_time_range_sum_matches_brute(ray_session):
    """RANGE frame [ts-p, ts] incl. equal-ts peers on BOTH sides of the
    row, against an O(n^2) brute force — heavy ts ties force the peer
    rule, many single-row keys force segment clamping."""
    import ray.data

    from engine.ops.window import time_range_sum

    rng = np.random.default_rng(23)
    n = 3000
    k = rng.integers(0, 30, n).astype(np.int64)
    ts = rng.integers(0, 120, n).astype(np.int64)  # heavy ties
    eid = rng.permutation(n).astype(np.int64)
    v = rng.integers(-500, 500, n).astype(np.int64)
    ds = ray.data.from_arrow(pa.table(
        {"k": k, "ts": ts, "eid": eid, "v": v})).repartition(7)
    out = time_range_sum(ds, "k", "ts", "v", preceding=10,
                         id_col="eid").take_all()
    got = {r["eid"]: (r["win_sum"], r["win_n"]) for r in out}
    assert len(got) == n
    for i in range(n):
        m = (k == k[i]) & (ts >= ts[i] - 10) & (ts <= ts[i])
        assert got[int(eid[i])] == (int(v[m].sum()), int(m.sum()))


def test_time_range_sum_zero_window(ray_session):
    """preceding=0 → the frame is exactly the equal-ts peer group."""
    import ray.data

    from engine.ops.window import time_range_sum

    t = pa.table({"k": [1, 1, 1, 2], "ts": [5, 5, 9, 5],
                  "v": [10, 20, 40, 7], "id": [0, 1, 2, 3]})
    out = {r["id"]: (r["win_sum"], r["win_n"])
           for r in time_range_sum(ray.data.from_arrow(t), "k", "ts",
                                   "v", preceding=0,
                                   id_col="id").take_all()}
    assert out == {0: (30, 2), 1: (30, 2), 2: (40, 1), 3: (7, 1)}


# ------------------------------------------------------ markov transitions
def test_markov_transitions_matches_brute(ray_session):
    import ray.data

    from engine.ops.window import markov_transitions

    rng = np.random.default_rng(31)
    n = 5000
    k = rng.integers(0, 40, n).astype(np.int64)
    ts = rng.integers(0, 200, n).astype(np.int64)
    eid = rng.permutation(n).astype(np.int64)
    st = np.array(["a", "b", "c", "d"])[rng.integers(0, 4, n)]
    ds = ray.data.from_arrow(pa.table(
        {"k": k, "ts": ts, "eid": eid, "s": st})).repartition(11)
    got = markov_transitions(ds, "k", ["ts", "eid"], "s")
    gd = {(p, q): c for p, q, c in zip(
        got["prev_state"].to_pylist(), got["next_state"].to_pylist(),
        got["n"].to_pylist())}
    brute = {}
    for kk in np.unique(k):
        m = k == kk
        order = np.lexsort((eid[m], ts[m]))
        ss = st[m][order]
        for a, b in zip(ss[:-1], ss[1:]):
            brute[(a, b)] = brute.get((a, b), 0) + 1
    assert gd == brute
    assert sum(gd.values()) == n - len(np.unique(k))


def test_markov_transitions_singletons(ray_session):
    """Keys with one row contribute no transitions; empty result has
    the input's state type."""
    import ray.data

    from engine.ops.window import markov_transitions

    t = pa.table({"k": [1, 2, 3], "o": [0, 0, 0],
                  "s": ["x", "y", "z"]})
    got = markov_transitions(ray.data.from_arrow(t), "k", ["o"], "s")
    assert got.num_rows == 0
    assert got.schema.field("prev_state").type == pa.string()


# ---------------------------------------------------- grouped regression
def test_grouped_regression_exact(ray_session):
    """Per-group slope/intercept/r against an exact-integer reference
    computed with Python bigints in the documented evaluation order —
    bit-identical doubles, plus a sanity cross-check vs numpy lstsq."""
    import math

    import ray.data

    from engine.ops.stats import grouped_regression

    rng = np.random.default_rng(47)
    n = 4000
    g = np.array(["A", "B", "C"])[rng.integers(0, 3, n)]
    x = rng.integers(-50, 120, n).astype(np.int64)
    y = (3 * x + rng.integers(-40, 40, n)).astype(np.int64)
    ds = ray.data.from_arrow(pa.table(
        {"g": g, "x": x.astype(np.float64),
         "y": y.astype(np.float64)})).repartition(9)
    out = grouped_regression(ds, "g", "x", "y")
    got = {out["g"][i].as_py():
           (out["n"][i].as_py(), out["slope"][i].as_py(),
            out["intercept"][i].as_py(), out["r"][i].as_py())
           for i in range(out.num_rows)}
    assert set(got) == {"A", "B", "C"}
    for gg in "ABC":
        m = g == gg
        xi = [int(v) for v in x[m]]
        yi = [int(v) for v in y[m]]
        nn = len(xi)
        sx, sy = sum(xi), sum(yi)
        sxx = sum(v * v for v in xi)
        syy = sum(v * v for v in yi)
        sxy = sum(a * b for a, b in zip(xi, yi))
        num = float(nn * sxy - sx * sy)
        vx = float(nn * sxx - sx * sx)
        vy = float(nn * syy - sy * sy)
        slope = num / vx
        inter = (float(sy) - slope * float(sx)) / float(nn)
        r = num / (math.sqrt(vx) * math.sqrt(vy))
        assert got[gg] == (nn, slope, inter, r)
        # numpy cross-check (approximate)
        fit = np.polyfit(x[m].astype(float), y[m].astype(float), 1)
        assert abs(fit[0] - slope) < 1e-8 and abs(fit[1] - inter) < 1e-6


def test_grouped_regression_degenerate(ray_session):
    """A constant-x group has no defined slope (NaN, not a crash)."""
    import ray.data

    from engine.ops.stats import grouped_regression

    t = pa.table({"g": ["k", "k", "z", "z", "z"],
                  "x": [5.0, 5.0, 1.0, 2.0, 3.0],
                  "y": [1.0, 9.0, 2.0, 4.0, 6.0]})
    out = grouped_regression(ray.data.from_arrow(t), "g", "x", "y")
    got = {out["g"][i].as_py(): (out["slope"][i].as_py(),
                                 out["r"][i].as_py())
           for i in range(out.num_rows)}
    assert np.isnan(got["k"][0]) and np.isnan(got["k"][1])
    assert got["z"][0] == 2.0
    # r of a perfect line is 1 up to the formula's sqrt roundings
    assert abs(got["z"][1] - 1.0) < 1e-12


# --------------------------------------------- text corpus primitives
def test_doc_distinct_words_brute():
    from engine.ops.text import doc_distinct_words

    texts = ["a b a c", "x", "", "b b b", "a  a", "hello world hello"]
    out = doc_distinct_words(pa.table({"text": texts}))
    got = sorted(out["word"].to_pylist())
    brute = []
    for t in texts:
        brute.extend(set(t.split(" ")))  # split(' ') keeps '' tokens
    assert got == sorted(brute)


def test_bigram_explode_brute():
    from engine.ops.text import bigram_explode

    texts = ["a b c", "solo", "", "x y", "p  q", "a a a a"]
    out = bigram_explode(pa.table({"text": texts}))
    got = sorted(zip(out["w1"].to_pylist(), out["w2"].to_pylist()))
    brute = []
    for t in texts:
        ws = t.split(" ")
        brute.extend(zip(ws[:-1], ws[1:]))
    assert got == sorted(brute)


def test_bigram_explode_sliced_offsets():
    """A table slice carries a nonzero ListArray base offset — the
    offset-arithmetic must rebase."""
    from engine.ops.text import bigram_explode

    t = pa.table({"text": ["a b", "c d e", "f g"]}).slice(1)
    out = bigram_explode(t)
    got = sorted(zip(out["w1"].to_pylist(), out["w2"].to_pylist()))
    assert got == [("c", "d"), ("d", "e"), ("f", "g")]


def test_shuffle_positions_matches_hashlib(ray_session):
    """Positions are the exact permutation of md5(str(id)) hex order."""
    import hashlib

    import ray.data

    from engine.ops.scan import shuffle_positions

    ids = np.arange(1, 1201, dtype=np.int64)
    rng = np.random.default_rng(5)
    rng.shuffle(ids)
    ds = ray.data.from_arrow(pa.table({"doc_id": ids})).repartition(9)
    out = shuffle_positions(ds, "doc_id").take_all()
    got = {r["doc_id"]: r["pos"] for r in out}
    order = sorted(ids.tolist(),
                   key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
    assert got == {i: p for p, i in enumerate(order)}
    assert sorted(got.values()) == list(range(len(ids)))


# ---------------------------------------------------- z-score outliers
def test_grouped_zscore_outliers_brute(ray_session):
    """Exact integer 3σ flag vs float brute force — the exact test can
    only disagree with float where |z| sits within float error of 3,
    so brute-check both directions away from the boundary."""
    import ray.data

    from engine.ops.stats import grouped_zscore_outliers

    rng = np.random.default_rng(11)
    n = 8000
    k = rng.integers(0, 12, n).astype(np.int64)
    v = rng.normal(0, 50, n)
    v[rng.integers(0, n, 40)] += 1000  # planted outliers
    ids = np.arange(n, dtype=np.int64)
    ds = ray.data.from_arrow(pa.table(
        {"u": k, "id": ids, "v": np.round(v, 2)})).repartition(7)
    out = grouped_zscore_outliers(ds, "u", "v", id_cols=["id"],
                                  scale=100, z=3)
    got = set(r["id"] for r in out.take_all())
    c = np.rint(np.round(v, 2) * 100).astype(np.int64)
    want = set()
    for kk in np.unique(k):
        m = k == kk
        cc = [int(x) for x in c[m]]
        nn, sy = len(cc), sum(cc)
        syy = sum(x * x for x in cc)
        thr = 9 * (nn * syy - sy * sy)
        for i, x in zip(ids[m], cc):
            if (nn * x - sy) ** 2 > thr:
                want.add(int(i))
    assert got == want
    assert len(got) >= 30  # the planted outliers are found


def test_grouped_zscore_outliers_zero_variance(ray_session):
    import ray.data

    from engine.ops.stats import grouped_zscore_outliers

    t = pa.table({"u": [1, 1, 1, 2, 2, 2],
                  "id": [0, 1, 2, 3, 4, 5],
                  "v": [5.0, 5.0, 5.0, 1.0, 1.0, 100.0]})
    out = grouped_zscore_outliers(ray.data.from_arrow(t), "u", "v",
                                  id_cols=["id"])
    # constant group flags nothing; 3-point group: z of 100 is only
    # sqrt(2) < 3 population σ, so nothing flags there either
    assert out.count() == 0


# ------------------------------------------------------ co-occurrence
def test_cooccur_pairs_brute(ray_session):
    import itertools

    import ray.data

    from engine.ops.basket import cooccur_pairs

    rng = np.random.default_rng(17)
    n = 6000
    g = rng.integers(0, 400, n).astype(np.int64)
    it = rng.integers(0, 30, n).astype(np.int64)  # heavy duplicate items
    ds = ray.data.from_arrow(pa.table({"g": g, "i": it})).repartition(9)
    out = cooccur_pairs(ds, "g", "i").take_all()
    got = sorted((r["item1"], r["item2"]) for r in out)
    brute = []
    for gg in np.unique(g):
        items = sorted(set(it[g == gg].tolist()))
        brute.extend(itertools.combinations(items, 2))
    assert got == sorted(brute)
    assert all(a < b for a, b in got)


# ---------------------------------------------------- windowed followups
def test_windowed_followups_brute(ray_session):
    """Pairs within [ (ts,id) strictly after, ts ≤ ts_i + W ] vs an
    O(n²) brute force — heavy ts ties exercise the id tie-break."""
    import ray.data

    from engine.ops.window import windowed_followups

    rng = np.random.default_rng(29)
    n = 2500
    k = rng.integers(0, 25, n).astype(np.int64)
    ts = rng.integers(0, 150, n).astype(np.int64)
    eid = rng.permutation(n).astype(np.int64)
    st = np.array(["a", "b", "c"])[rng.integers(0, 3, n)]
    ds = ray.data.from_arrow(pa.table(
        {"k": k, "ts": ts, "eid": eid, "s": st})).repartition(8)
    got = windowed_followups(ds, "k", "ts", "eid", "s", window=12)
    gd = {(a, b): c for a, b, c in zip(got["t1"].to_pylist(),
                                       got["t2"].to_pylist(),
                                       got["n"].to_pylist())}
    brute = {}
    for i in range(n):
        for j in range(n):
            if (k[i] == k[j]
                    and (ts[j], eid[j]) > (ts[i], eid[i])
                    and ts[j] <= ts[i] + 12):
                p = (st[i], st[j])
                brute[p] = brute.get(p, 0) + 1
    assert gd == brute


def test_windowed_followups_zero_window(ray_session):
    """window=0 → only equal-ts pairs ordered by id."""
    import ray.data

    from engine.ops.window import windowed_followups

    t = pa.table({"k": [1, 1, 1, 1], "ts": [5, 5, 5, 9],
                  "eid": [2, 0, 1, 3],
                  "s": ["x", "y", "z", "w"]})
    got = windowed_followups(ray.data.from_arrow(t), "k", "ts", "eid",
                             "s", window=0)
    gd = {(a, b): c for a, b, c in zip(got["t1"].to_pylist(),
                                       got["t2"].to_pylist(),
                                       got["n"].to_pylist())}
    # id order at ts=5: y(0) → z(1) → x(2)
    assert gd == {("y", "z"): 1, ("y", "x"): 1, ("z", "x"): 1}


def test_doc_term_freqs_brute():
    from collections import Counter

    from engine.ops.text import doc_term_freqs

    texts = ["a b a", "", "c c  c", "solo"]
    t = doc_term_freqs(pa.table({"doc_id": [1, 2, 3, 4], "text": texts}))
    got = sorted(zip(t["doc_id"].to_pylist(), t["word"].to_pylist(),
                     t["tf"].to_pylist()))
    brute = sorted((i + 1, w, c) for i, txt in enumerate(texts)
                   for w, c in Counter(txt.split(" ")).items())
    assert got == brute


# ------------------------------------------- batch-5 query compositions
def _mini_events(tmp_path, n=4000, seed=41):
    """Synthetic events.parquet shaped like the testdata table."""
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    ts = (1_700_000_000_000_000
          + rng.integers(0, 40 * 86_400_000_000, n))
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts.astype("datetime64[us]")),
        "user_id": pa.array(rng.integers(0, 60, n).astype(np.int64)),
        "event_type": pa.array(
            np.array(["view", "click", "purchase", "signup"])[
                rng.integers(0, 4, n)]),
        "value": pa.array(np.round(rng.uniform(0, 300, n), 2)),
        "props": pa.array(["{}"] * n),
    })
    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    pq.write_table(t, str(d / "events.parquet"))
    return str(d), t


def test_first_touch_brute(ray_session, tmp_path):
    import __ray_entry__ as e

    sf, t = _mini_events(tmp_path)
    out = e.queries()["first_touch"](sf)
    got = {r["first_type"]: (r["n_users"], r["n_converted"])
           for r in out.to_pylist()}
    u = t["user_id"].to_numpy()
    ts = t["ts"].cast(pa.int64()).to_numpy()
    eid = t["event_id"].to_numpy()
    et = np.asarray(t["event_type"].to_pylist(), dtype=object)
    brute = {}
    for uu in np.unique(u):
        m = u == uu
        i = np.lexsort((eid[m], ts[m]))[0]
        ft = et[m][i]
        conv = int((et[m] == "purchase").any())
        nu, nc = brute.get(ft, (0, 0))
        brute[ft] = (nu + 1, nc + conv)
    assert got == brute


def test_value_histogram_brute(ray_session, tmp_path):
    import __ray_entry__ as e

    sf, t = _mini_events(tmp_path)
    out = {r["bucket"]: r["n"]
           for r in e.queries()["value_histogram"](sf).take_all()}
    v = t["value"].to_numpy()
    mn, mx = float(v.min()), float(v.max())
    b = np.minimum(np.floor((v - mn) * 20.0 / (mx - mn)), 19).astype(int)
    brute = dict(zip(*[a.tolist() for a in np.unique(b, return_counts=True)]))
    assert out == brute
    assert out.get(19, 0) >= 1  # the max value lands in the last bucket


def test_cube_counts_margins(ray_session, tmp_path):
    import __ray_entry__ as e

    sf, t = _mini_events(tmp_path, n=2000, seed=43)
    out = e.queries()["cube_counts"](sf)
    cells = {(a, b): c for a, b, c in zip(out["event_type"].to_pylist(),
                                          out["weekday"].to_pylist(),
                                          out["n"].to_pylist())}
    n = t.num_rows
    assert cells[("ALL", "ALL")] == n
    # margins are consistent: each axis sums back to the total
    assert sum(v for (a, b), v in cells.items()
               if a != "ALL" and b == "ALL") == n
    assert sum(v for (a, b), v in cells.items()
               if a == "ALL" and b != "ALL") == n
    base = {k: v for k, v in cells.items()
            if k[0] != "ALL" and k[1] != "ALL"}
    assert sum(base.values()) == n
    et = np.asarray(t["event_type"].to_pylist(), dtype=object)
    wd = ((t["ts"].cast(pa.int64()).to_numpy() // 86_400_000_000 + 4)
          % 7).astype(np.int64)
    for (a, b), v in base.items():
        assert v == int(((et == a) & (wd == int(b))).sum())


# ------------------------------------------------------- running total
def test_running_total_brute(ray_session):
    import ray.data

    from engine.ops.window import running_total

    rng = np.random.default_rng(53)
    n = 3000
    k = rng.integers(0, 40, n).astype(np.int64)
    ts = rng.integers(0, 100, n).astype(np.int64)  # heavy ties
    eid = rng.permutation(n).astype(np.int64)
    v = rng.integers(-200, 200, n).astype(np.int64)
    ds = ray.data.from_arrow(pa.table(
        {"k": k, "ts": ts, "eid": eid, "v": v})).repartition(9)
    out = {r["eid"]: r["running"]
           for r in running_total(ds, "k", "ts", "eid", "v").take_all()}
    assert len(out) == n
    for kk in np.unique(k):
        m = k == kk
        order = np.lexsort((eid[m], ts[m]))
        run = np.cumsum(v[m][order])
        for e, r in zip(eid[m][order], run):
            assert out[int(e)] == int(r)


# ------------------------------------------------- grouped vector mean
def test_grouped_vector_mean_brute(ray_session):
    import ray.data

    from engine.ops.vecagg import grouped_vector_mean

    rng = np.random.default_rng(59)
    n, d = 2000, 8
    lab = rng.integers(0, 5, n).astype(np.int64)
    vec = rng.normal(0, 0.3, (n, d)).astype(np.float32)
    t = pa.table({
        "label": pa.array(lab),
        "embedding": pa.array(list(vec), type=pa.list_(pa.float32()))})
    out = grouped_vector_mean(
        ray.data.from_arrow(t).repartition(7), "label", "embedding")
    got = {(r["label"], r["dim"]): (r["s"], r["n"], r["mean_micro"])
           for r in out.to_pylist()}
    assert len(got) == 5 * d
    mv = np.rint(vec.astype(np.float64) * 1e6).astype(np.int64)
    for ll in range(5):
        m = lab == ll
        for dd in range(d):
            s = int(mv[m, dd].sum())
            nn = int(m.sum())
            assert got[(ll, dd)] == (s, nn, float(np.float64(s) / nn))


def test_grouped_vector_mean_ragged_raises(ray_session):
    import pytest as _pytest
    import ray.data

    from engine.ops.vecagg import grouped_vector_mean

    t = pa.table({"label": [0, 1],
                  "embedding": pa.array([[1.0, 2.0], [3.0]],
                                        type=pa.list_(pa.float32()))})
    with _pytest.raises(Exception):
        grouped_vector_mean(ray.data.from_arrow(t), "label", "embedding")


def test_cell_density_stats_consistent(ray_session):
    """Summary row agrees with the per-cell counts it summarizes."""
    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    cells = {r["cell"]: r["n_images"]
             for r in e.queries()["cell_counts"](sf).take_all()}
    s = e.queries()["cell_density_stats"](sf)
    n = np.sort(np.array(list(cells.values()), dtype=np.int64))
    assert s["n_cells"][0].as_py() == len(n)
    assert s["min_n"][0].as_py() == int(n[0])
    assert s["max_n"][0].as_py() == int(n[-1])
    assert s["total"][0].as_py() == int(n.sum())
    assert s["med_n"][0].as_py() == int(n[(len(n) - 1) // 2])


def test_exact_power_sums_vs_object_math():
    from engine.ops.stats import exact_power_sums

    rng = np.random.default_rng(5)
    for _ in range(4):
        c = rng.integers(0, 8_000_000,
                         size=int(rng.integers(1, 60_000))).astype(np.int64)
        v = c.astype(object)
        assert exact_power_sums(c) == (
            int(sum(v)), int(sum(v * v)), int(sum(v * v * v)),
            int(sum(v * v * v * v)))
    assert exact_power_sums(np.array([], dtype=np.int64)) == (0, 0, 0, 0)
    # boundary and the arbitrary-precision fallback (values >= 2^23)
    for arr in ([(1 << 23) - 1] * 777, [1 << 24, 5, 0]):
        c = np.array(arr, dtype=np.int64)
        v = c.astype(object)
        assert exact_power_sums(c) == (
            int(sum(v)), int(sum(v * v)), int(sum(v * v * v)),
            int(sum(v * v * v * v)))
