"""Round-5 regression tests for the ADVICE items: md5-kernel null/empty
handling, the setsim / lift / assortativity budget-guard fallbacks, and
the hexsphere out-of-field clamp."""

import numpy as np
import pyarrow as pa

import ray
import ray.data

from engine.ops.dedup import minhash_md5_batch, simhash_md5_batch


def _tbl(ids, texts):
    return pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                     "text": pa.array(texts, type=pa.string())})


# ------------------------------------------------------------- md5 kernels

def test_simhash_md5_trailing_null_text():
    # previously IndexError: trailing zero-token doc put len(h) into the
    # reduceat offsets
    out = simhash_md5_batch(_tbl([1, 2], ["alpha beta gamma", None]))
    # null-text doc drops out (md5(NULL) is NULL in the SQL mirror)
    assert set(out["doc_id"].to_pylist()) == {1}
    ref = simhash_md5_batch(_tbl([1], ["alpha beta gamma"]))
    assert out.equals(ref)


def test_simhash_md5_all_null_and_interior_null():
    out = simhash_md5_batch(_tbl([1, 2], [None, None]))
    assert out.num_rows == 0
    mixed = simhash_md5_batch(
        _tbl([1, 2, 3], ["a b c", None, "x y z"]))
    ref = pa.concat_tables([
        simhash_md5_batch(_tbl([1], ["a b c"])),
        simhash_md5_batch(_tbl([3], ["x y z"]))])
    assert sorted(mixed.to_pylist(), key=lambda r: (r["doc_id"], r["band"])) \
        == sorted(ref.to_pylist(), key=lambda r: (r["doc_id"], r["band"]))


def test_minhash_md5_null_text_skipped():
    out = minhash_md5_batch(
        _tbl([1, 2, 3], ["one two three four", None, "five six seven"]))
    assert set(out["doc_id"].to_pylist()) == {1, 3}
    ref = minhash_md5_batch(
        _tbl([1, 3], ["one two three four", "five six seven"]))
    assert sorted(out.to_pylist(), key=lambda r: (r["doc_id"], r["band"])) \
        == sorted(ref.to_pylist(), key=lambda r: (r["doc_id"], r["band"]))


def test_minhash_md5_trailing_null():
    out = minhash_md5_batch(_tbl([7, 8], ["hello world again", None]))
    assert set(out["doc_id"].to_pylist()) == {7}


# -------------------------------------------------- setsim join fallback

def test_setsim_fallback_join_plan(ray_session, monkeypatch):
    """Vocabulary past the broadcast budget → the grouped_count +
    equi_join frequency attach produces the same exact result."""
    import engine.ops.setsim as ss

    baskets = {1: {10, 11, 12}, 2: {10, 11, 12}, 3: {20, 21},
               4: {10, 11, 30}, 5: {40}}
    rows_id, rows_tok = [], []
    for k, s in baskets.items():
        for t in sorted(s):
            rows_id.append(k)
            rows_tok.append(t)
    tbl = pa.table({"id": pa.array(rows_id, type=pa.int64()),
                    "tok": pa.array(rows_tok, type=pa.int64())})

    def run():
        ds = ray.data.from_arrow(tbl).repartition(3)
        res = ss.setsim_join(ds, "id", "tok", 1, 2)
        got = pa.concat_tables(
            [b for b in res.iter_batches(batch_format="pyarrow")])
        return sorted(map(tuple, got.to_pandas().itertuples(index=False)))

    fast = run()
    # 7 distinct tokens > budget 5 → fallback join plan (the raw
    # candidate-pair rows, 4 here, stay under the shared verify budget)
    monkeypatch.setattr(ss, "PAIR_BROADCAST_MAX", 5)
    slow = run()
    assert fast == slow
    assert len(fast) > 0


# --------------------------------- lift / assortativity fold fallbacks

def _collect(res):
    if isinstance(res, ray.data.Dataset):
        return pa.concat_tables(
            [b for b in res.iter_batches(batch_format="pyarrow")])
    return res


def test_lift_pairs_fallback_matches(ray_session, monkeypatch):
    sf_dir = "/root/testdata/sf0.001"
    import __ray_entry__ as entry

    fast = _collect(entry._q_lift_pairs(sf_dir)).to_pandas()
    monkeypatch.setattr(entry, "_FOLD_BUDGET", 0)
    slow = _collect(entry._q_lift_pairs(sf_dir)).to_pandas()
    fast = fast.sort_values(list(fast.columns)).reset_index(drop=True)
    slow = slow.sort_values(list(slow.columns)).reset_index(drop=True)
    assert fast.equals(slow)
    assert len(fast) > 0


def test_degree_assortativity_fallback_matches(ray_session,
                                               monkeypatch):
    sf_dir = "/root/testdata/sf0.001"
    import __ray_entry__ as entry

    fast = _collect(entry._q_degree_assortativity(sf_dir)).to_pandas()
    monkeypatch.setattr(entry, "_FOLD_BUDGET", 0)
    slow = _collect(entry._q_degree_assortativity(sf_dir)).to_pandas()
    assert np.allclose(fast.to_numpy(dtype=float),
                       slow.to_numpy(dtype=float))


def test_spearman_fallback_matches(ray_session, monkeypatch):
    sf_dir = "/root/testdata/sf0.001"
    import __ray_entry__ as entry

    fast = _collect(entry._q_spearman_corr(sf_dir)).to_pandas()
    monkeypatch.setattr(entry, "_FOLD_BUDGET", 0)
    slow = _collect(entry._q_spearman_corr(sf_dir)).to_pandas()
    assert fast["n"][0] == slow["n"][0]
    assert abs(fast["spearman"][0] - slow["spearman"][0]) < 1e-12


# ------------------------------------------------------ hexsphere clamp

def test_encode_cells_clamp_no_crash():
    from engine.geo import hexsphere as hx

    # synthetic out-of-field res-0 axial: clamp keeps the id encodable
    # and in-field; "raise" still raises (the loud default)
    face = np.array([0, 0], dtype=np.int64)
    q = np.array([9, 0], dtype=np.int64)
    r = np.array([-8, 0], dtype=np.int64)
    import pytest

    with pytest.raises(AssertionError):
        hx._encode_cells(face, q, r, 0)
    ids = hx._encode_cells(face, q, r, 0, out_of_field="clamp")
    assert len(ids) == 2
    _cid, res, f, aq, ar = hx._decode(ids)
    assert (aq >= -3).all() and (aq <= 4).all()
    assert (ar >= -3).all() and (ar <= 4).all()


def test_h3x_cell_extreme_points_no_crash():
    from engine.geo import hexsphere as hx

    rng = np.random.default_rng(5)
    lon = rng.uniform(-180, 180, 20000)
    lat = rng.uniform(-90, 90, 20000)
    for res in (0, 3, 7, 13):
        ids = hx.h3x_cell(lon, lat, res)
        assert len(ids) == len(lon)
        # ids decode back in-field
        _cid, rs, f, aq, ar = hx._decode(ids)
        assert (rs == res).all()
        assert (aq >= -3).all() and (aq <= 4).all()


def test_h3x_neighbors_never_crashes_on_edge_cells():
    from engine.geo import hexsphere as hx

    rng = np.random.default_rng(6)
    lon = rng.uniform(-180, 180, 2000)
    lat = rng.uniform(-90, 90, 2000)
    cells = np.unique(hx.h3x_cell(lon, lat, 2))
    nb = hx.h3x_neighbors(cells)
    assert nb.shape == (len(cells), 6)


# -------------------------------------------------- payload cache keying

def test_payload_cache_key_includes_version(tmp_path):
    from engine.rayds import imgstage

    d1 = imgstage._payload_cache_dir(str(tmp_path))
    old = imgstage.PAYLOAD_FORMAT_VERSION
    try:
        imgstage.PAYLOAD_FORMAT_VERSION = old + "-bumped"
        d2 = imgstage._payload_cache_dir(str(tmp_path))
    finally:
        imgstage.PAYLOAD_FORMAT_VERSION = old
    assert d1 != d2
    # per-user root, not the fixed world-shared /tmp path
    assert "/tmp/ray_geo_payload_cache/" not in d1


# ------------------------------------------ vectorized cover superset

def test_s2_cover_rects_many_superset():
    from engine.geo import cells

    rng = np.random.default_rng(11)
    n = 300
    cx = rng.uniform(-175, 175, n)
    cy = rng.uniform(-70, 70, n)
    w = rng.uniform(0.02, 8.0, n)
    h = rng.uniform(0.02, 6.0, n)
    rects = np.column_stack([
        np.maximum(cx - w, -180.0), np.maximum(cy - h, -89.9),
        np.minimum(cx + w, 180.0), np.minimum(cy + h, 89.9)])
    lv = cells.s2_level_for_rects(rects, 24, 12)
    rows, ids = cells.s2_cover_rects_many(rects, lv)
    order = np.argsort(rows, kind="stable")
    ro, io = rows[order], ids[order]
    st = np.searchsorted(ro, np.arange(n))
    en = np.searchsorted(ro, np.arange(n), side="right")
    for i in range(n):
        px = np.r_[rng.uniform(rects[i, 0], rects[i, 2], 30),
                   rects[i, 0], rects[i, 2]]
        py = np.r_[rng.uniform(rects[i, 1], rects[i, 3], 30),
                   rects[i, 1], rects[i, 3]]
        keys = np.asarray(cells.s2_cell(
            np.clip(px, -179.999999, 179.999999), py, int(lv[i])))
        assert np.isin(keys, io[st[i]:en[i]]).all(), i
        # single level per rect => disjoint cover
        assert len(np.unique(io[st[i]:en[i]])) == en[i] - st[i]


def test_h3x_cover_rects_many_superset_incl_antimeridian():
    from engine.geo import hexsphere as hx

    rng = np.random.default_rng(13)
    n = 200
    # bias some rects onto the ±180 seam (the wrap regression); rects
    # stay inside [-180, 180] (the production _lonlat contract)
    cx = np.r_[rng.uniform(-179, 179, n - 40),
               rng.uniform(-180, -178, 20), rng.uniform(178, 180, 20)]
    cy = rng.uniform(-75, 75, n)
    w = rng.uniform(0.1, 9.0, n)
    h = rng.uniform(0.1, 5.0, n)
    rects = np.column_stack([np.maximum(cx - w, -180.0), cy - h,
                             np.minimum(cx + w, 180.0), cy + h])
    rows, ids = hx.h3x_cover_rects_many(rects, 2)
    order = np.argsort(rows, kind="stable")
    ro, io = rows[order], ids[order]
    st = np.searchsorted(ro, np.arange(n))
    en = np.searchsorted(ro, np.arange(n), side="right")
    for i in range(n):
        px = np.r_[rng.uniform(rects[i, 0], rects[i, 2], 40),
                   rects[i, 0], rects[i, 2]]
        py = np.r_[rng.uniform(rects[i, 1], rects[i, 3], 40),
                   rects[i, 1], rects[i, 3]]
        keys = hx.h3x_cell(np.clip(px, -179.999999, 179.999999),
                           np.clip(py, -89.9, 89.9), 2)
        assert np.isin(keys, io[st[i]:en[i]]).all(), i


def test_h3x_cover_rects_many_matches_needs_of_single():
    """Single-rect path still a superset after the wrap fix."""
    from engine.geo import hexsphere as hx

    rng = np.random.default_rng(17)
    for _ in range(30):
        lo = rng.uniform(-180, 168)
        la = rng.uniform(-70, 60)
        rect = (lo, la, lo + rng.uniform(0.5, 12), la + rng.uniform(0.5, 8))
        cov = hx.h3x_cover_rect(*rect, 3)
        px = rng.uniform(rect[0], rect[2], 50)
        py = rng.uniform(rect[1], rect[3], 50)
        keys = hx.h3x_cell(np.clip(px, -179.999999, 179.999999),
                           np.clip(py, -89.9, 89.9), 3)
        assert np.isin(keys, cov).all()


def test_bbox_cover_keys_vectorized_matches_brute():
    from engine.rayds import celljoin as cj

    rng = np.random.default_rng(19)
    n = 50
    cx = rng.uniform(0, 100, n)
    cy = rng.uniform(0, 100, n)
    w = rng.uniform(0.1, 20.0, n)
    bounds = np.column_stack([cx - w, cy - w, cx + w, cy + w])
    bounds[7] = np.nan
    key_fn = lambda x, y: cj._hex_key(x, y, 7)
    rows, keys = cj._bbox_cover_keys(bounds, key_fn)
    # brute: per-bbox meshgrid + unique
    c = cj.S2_SNAP
    for i in range(n):
        if np.isnan(bounds[i, 0]):
            assert (rows != i).all()
            continue
        xs = (np.arange(int(np.floor(bounds[i, 0] / c)),
                        int(np.floor(bounds[i, 2] / c)) + 1) + 0.5) * c
        ys = (np.arange(int(np.floor(bounds[i, 1] / c)),
                        int(np.floor(bounds[i, 3] / c)) + 1) + 0.5) * c
        gx, gy = np.meshgrid(xs, ys)
        want = np.unique(key_fn(gx.reshape(-1), gy.reshape(-1)))
        got = np.sort(keys[rows == i])
        assert np.array_equal(got, want), i


# ------------------------------------------- generic bulk STRtree.nearest

def test_strtree_bulk_nearest_polygon_tree_parity():
    """Bulk nearest on a NON-boxlike tree (triangles) must equal the
    scalar best-first walk — the r4 scalar-fallback gap."""
    from engine.geo import from_wkt
    from engine.geo.geom import Geom
    from engine.geo.strtree import STRtree

    rng = np.random.default_rng(23)
    polys = []
    for _ in range(400):
        cx, cy = rng.uniform(0, 50, 2)
        a = rng.uniform(0, 2 * np.pi, 3)
        r = rng.uniform(0.2, 1.0, 3)
        xs = cx + r * np.cos(a)
        ys = cy + r * np.sin(a)
        polys.append(from_wkt(
            f"POLYGON(({xs[0]} {ys[0]},{xs[1]} {ys[1]},"
            f"{xs[2]} {ys[2]},{xs[0]} {ys[0]}))"))
    tree = STRtree(polys)
    pts = [Geom.point(float(x), float(y))
           for x, y in rng.uniform(0, 50, (300, 2))]
    # include points inside polygons (interior-zero path)
    for i in range(0, 60, 3):
        b = polys[i].bounds
        pts.append(Geom.point((b[0] + b[2]) / 2, (b[1] + b[3]) / 2))
    got = tree.nearest(pts)
    exp = np.array([tree._nearest_one(g, all_matches=False)[0][0]
                    for g in pts])
    assert np.array_equal(got, exp)


def test_strtree_bulk_nearest_mixed_tree_and_line_queries():
    from engine.geo import from_wkt
    from engine.geo.strtree import STRtree

    rng = np.random.default_rng(29)
    mixed = (
        [from_wkt(f"POINT({x} {y})") for x, y in rng.uniform(0, 40, (60, 2))]
        + [from_wkt(f"LINESTRING({x} {y},{x+2} {y+1})")
           for x, y in rng.uniform(0, 38, (60, 2))]
        + [from_wkt(f"POLYGON(({x} {y},{x+1} {y},{x+1} {y+1},{x} {y}))")
           for x, y in rng.uniform(0, 39, (60, 2))])
    tree = STRtree(mixed)
    queries = [from_wkt(f"LINESTRING({x} {y},{x+0.5} {y+2})")
               for x, y in rng.uniform(0, 38, (50, 2))]
    got = tree.nearest(queries)
    exp = np.array([tree._nearest_one(g, all_matches=False)[0][0]
                    for g in queries])
    assert np.array_equal(got, exp)


def test_query_nearest_bulk_parity():
    """Bulk point query_nearest == the scalar walk across max_distance,
    all_matches, and exclusive (incl. equal-geometry exclusion whose
    pruning bound must not orphan a query's other matches)."""
    from engine.geo import from_wkt
    from engine.geo.geom import Geom
    from engine.geo.strtree import STRtree

    rng = np.random.default_rng(31)
    polys = []
    for _ in range(300):
        cx, cy = rng.uniform(0, 40, 2)
        a = rng.uniform(0, 2 * np.pi, 3)
        r = rng.uniform(0.2, 1.0, 3)
        xs = cx + r * np.cos(a)
        ys = cy + r * np.sin(a)
        polys.append(from_wkt(
            f"POLYGON(({xs[0]} {ys[0]},{xs[1]} {ys[1]},"
            f"{xs[2]} {ys[2]},{xs[0]} {ys[0]}))"))
    tree = STRtree(polys)
    pts = [Geom.point(float(x), float(y))
           for x, y in rng.uniform(0, 40, (200, 2))]

    def scalar(**kw):
        ii, tt, dd = [], [], []
        for i, g in enumerate(pts):
            m, d = tree._nearest_one(g, **kw)
            for t in m:
                ii.append(i)
                tt.append(t)
                dd.append(d)
        return np.array([ii, tt]), np.array(dd)

    for kw in ({}, {"max_distance": 0.5}, {"all_matches": False}):
        got, gd = tree.query_nearest(pts, return_distance=True, **kw)
        exp, ed = scalar(max_distance=kw.get("max_distance"),
                         all_matches=kw.get("all_matches", True))
        assert got.shape == exp.shape and (got == exp).all()
        assert np.allclose(gd, ed)

    # exclusive: tree of points, half the queries ARE tree members
    tp = [Geom.point(float(x), float(y))
          for x, y in rng.uniform(0, 10, (120, 2))]
    tree2 = STRtree(tp)
    qs = tp[:40] + [Geom.point(float(x), float(y))
                    for x, y in rng.uniform(0, 10, (40, 2))]
    got, gd = tree2.query_nearest(qs, exclusive=True,
                                  return_distance=True)
    ii, tt, dd = [], [], []
    for i, g in enumerate(qs):
        m, d = tree2._nearest_one(g, exclusive=True)
        for t in m:
            ii.append(i)
            tt.append(t)
            dd.append(d)
    exp = np.array([ii, tt])
    assert got.shape == exp.shape and (got == exp).all()
    assert np.allclose(gd, np.array(dd))


def test_semivariogram_brute(ray_session):
    """Distributed semivariogram == the O(n²) driver brute force on
    random points (pair-once rule, binning, exact integer sums)."""
    from engine.ops.variogram import semivariogram

    rng = np.random.default_rng(41)
    n = 800
    x = rng.uniform(0, 30, n)
    y = rng.uniform(0, 30, n)
    v = rng.integers(0, 100, n)
    ids = rng.permutation(n).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({
        "x": pa.array(x), "y": pa.array(y),
        "v": pa.array(v.astype(np.int64)), "id": pa.array(ids),
    })).repartition(5)
    max_lag, nbins = 3.0, 6
    got = semivariogram(ds, "x", "y", "v", "id", max_lag, nbins) \
        .to_pandas().set_index("bin")
    binw = max_lag / nbins
    cnt = np.zeros(nbins, dtype=np.int64)
    ss = np.zeros(nbins, dtype=np.int64)
    for i in range(n):
        dx = x[i] - x[i + 1:]
        dy = y[i] - y[i + 1:]
        d = np.sqrt(dx * dx + dy * dy)
        ok = d <= max_lag
        db = np.minimum((d[ok] / binw).astype(np.int64), nbins - 1)
        dv = (v[i] - v[i + 1:])[ok].astype(np.int64)
        np.add.at(cnt, db, 1)
        np.add.at(ss, db, dv * dv)
    for b in range(nbins):
        if cnt[b] == 0:
            assert b not in got.index
            continue
        assert got.loc[b, "n_pairs"] == cnt[b], b
        assert got.loc[b, "gamma"] == ss[b] / (2.0 * cnt[b]), b


def test_ripley_k_monotone_and_consistent(ray_session):
    """K̂ is cumulative-monotone and its bin-0..7 pair counts agree
    with the semivariogram's per-bin counts on the same field."""
    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    rk = e._q_ripley_k(sf).to_pandas()
    sv = e._q_semivariogram(sf).to_pandas()
    assert (np.diff(rk["cum_pairs"]) >= 0).all()
    assert (np.diff(rk["k_hat"]) >= 0).all()
    assert rk["cum_pairs"].iloc[-1] == sv["n_pairs"].sum()
