"""Tests for engine/ops/knn.py (exact big-big kNN join) and
engine/ops/funnel.py (ordered funnel counts)."""

import numpy as np
import pyarrow as pa


def _brute_knn(lid, lx, ly, rid, rx, ry, k, exclude_same_id):
    out = set()
    for i in range(len(lid)):
        d2 = (lx[i] - rx) ** 2 + (ly[i] - ry) ** 2
        if exclude_same_id:
            d2 = np.where(rid == lid[i], np.inf, d2)
        order = np.lexsort((rid, d2))
        cnt = 0
        for j in order:
            if not np.isfinite(d2[j]):
                continue
            cnt += 1
            if cnt > k:
                break
            out.add((int(lid[i]), int(rid[j]), cnt, float(d2[j])))
    return out


def _run_knn(ray_session, seed, n_l, n_r, k, cell, tail_budget,
             exclude_same=False, planted_isolated=False, extent=12.0,
             grid_hi=16.0):
    import ray.data

    from engine.ops.knn import knn_join

    rng = np.random.default_rng(seed)
    lx = rng.uniform(0, extent, n_l)
    ly = rng.uniform(0, extent, n_l)
    rx = rng.uniform(0, extent, n_r)
    ry = rng.uniform(0, extent, n_r)
    if planted_isolated:
        # a left far outside the data cloud: empty ring-1, must survive
        # escalation via sentinel rows (not vanish)
        lx[0], ly[0] = grid_hi - 1.0, grid_hi - 1.0
    lid = np.arange(n_l, dtype=np.int64)
    rid = (np.arange(n_r, dtype=np.int64) if not exclude_same
           else np.arange(n_l, n_l + n_r, dtype=np.int64))
    if exclude_same:
        # overlap ids so self-exclusion actually triggers
        rid[: n_l // 2] = lid[: n_l // 2]
    lds = ray.data.from_arrow(
        pa.table({"id": lid, "x": lx, "y": ly})).repartition(5)
    rds = ray.data.from_arrow(
        pa.table({"id": rid, "x": rx, "y": ry})).repartition(7)
    got = {(r["lid"], r["rid"], r["nn_rank"], r["d2"])
           for r in knn_join(lds, rds, k=k, cell=cell, left_id="id",
                             right_id="id", exclude_same_id=exclude_same,
                             grid_hi=grid_hi, num_parts=16,
                             tail_budget=tail_budget).take_all()}
    want = _brute_knn(lid, lx, ly, rid, rx, ry, k, exclude_same)
    assert got == want


def test_knn_join_fast_path(ray_session):
    # dense grid → round-1 fast path resolves everything
    _run_knn(ray_session, 1, 300, 4000, 3, cell=4.0, tail_budget=10**6)


def test_knn_join_tail_pass(ray_session):
    # sparse grid, tiny cell → unresolved tail finished by the
    # broadcast full-scan pass
    _run_knn(ray_session, 2, 200, 300, 4, cell=0.5, tail_budget=10**6)


def test_knn_join_annulus_rounds(ray_session):
    # tail_budget=0 forces the multi-round annulus escalation all the
    # way to resolution (incl. full-cover fallback)
    _run_knn(ray_session, 3, 80, 120, 3, cell=0.5, tail_budget=0)


def test_knn_join_isolated_point(ray_session):
    # empty ring-1 neighborhood: sentinels must carry the left through
    # escalation; both finish modes
    _run_knn(ray_session, 4, 60, 80, 2, cell=1.0, tail_budget=10**6,
             planted_isolated=True)
    _run_knn(ray_session, 4, 60, 80, 2, cell=1.0, tail_budget=0,
             planted_isolated=True)


def test_knn_join_self_exclusion(ray_session):
    _run_knn(ray_session, 5, 100, 400, 3, cell=4.0, tail_budget=10**6,
             exclude_same=True)


def test_knn_join_fewer_than_k_rights(ray_session):
    # k exceeds |rights| → each left gets every right, ranked
    _run_knn(ray_session, 6, 50, 3, 5, cell=8.0, tail_budget=0)


def test_auto_cell_power_of_two():
    import math

    from engine.ops.knn import auto_cell

    for n in (10, 1_000, 100_000, 10**7):
        c = auto_cell(n, 100.0, 4)
        assert math.log2(c) == int(math.log2(c))
    assert auto_cell(0, 100.0, 4) == 2.0


# ------------------------------------------------------------------ funnel
def test_funnel_counts_matches_brute(ray_session):
    import ray.data

    from engine.ops.funnel import funnel_counts

    rng = np.random.default_rng(20)
    n = 50_000
    users = rng.integers(0, 800, n)
    ts = rng.integers(0, 10**6, n)
    types = np.array(["a", "b", "c", "noise"])[rng.integers(0, 4, n)]
    ds = ray.data.from_arrow(pa.table({
        "u": users, "t": ts, "et": types})).repartition(9)
    got = {r["step"]: r["users"] for r in funnel_counts(
        ds, "u", "t", ["a", "b", "c"], type_col="et").take_all()}

    want = {1: 0, 2: 0, 3: 0}
    for u in np.unique(users):
        m = users == u
        ut, uty = ts[m], types[m]
        prev = -1
        for i, step in enumerate(["a", "b", "c"]):
            cand = ut[(uty == step) & (ut > prev)]
            if len(cand) == 0:
                break
            prev = cand.min()
            want[i + 1] += 1
    assert got == want
    assert got[1] >= got[2] >= got[3] > 0


def test_funnel_strictly_after(ray_session):
    """Equal timestamps do NOT satisfy 'after' (strict >), mirroring
    the SQL oracle."""
    import ray.data

    from engine.ops.funnel import funnel_counts

    t = pa.table({
        "u": pa.array([1, 1, 2, 2], type=pa.int64()),
        "t": pa.array([10, 10, 10, 11], type=pa.int64()),
        "et": pa.array(["a", "b", "a", "b"]),
    })
    got = {r["step"]: r["users"] for r in funnel_counts(
        ray.data.from_arrow(t).repartition(2), "u", "t",
        ["a", "b"], type_col="et").take_all()}
    assert got == {1: 2, 2: 1}  # user 1's b is NOT after its a
