"""Brute-force parity for the PPJoin set-similarity join and the
n-gram explode primitive."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from engine.ops.setsim import setsim_join
from engine.ops.text import ngram_explode


def _to_table(res):
    if isinstance(res, ray.data.Dataset):
        return pa.concat_tables(
            [b for b in res.iter_batches(batch_format="pyarrow")])
    return res


def _brute(baskets, tau_num, tau_den):
    ids = sorted(baskets)
    out = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            A, B = baskets[a], baskets[b]
            inter = len(A & B)
            if tau_den * inter >= tau_num * (len(A) + len(B) - inter):
                out[(a, b)] = (inter, len(A), len(B))
    return out


def _run(baskets, tau_num, tau_den, blocks=6):
    rows_id, rows_tok = [], []
    for k, s in baskets.items():
        for t in sorted(s):
            rows_id.append(k)
            rows_tok.append(t)
    ds = ray.data.from_arrow(pa.table({
        "id": pa.array(rows_id, type=pa.int64()),
        "tok": pa.array(rows_tok, type=pa.int64()),
    })).repartition(blocks)
    got = _to_table(setsim_join(ds, "id", "tok", tau_num,
                                tau_den)).to_pandas()
    return {(r.o1, r.o2): (r.inter, r.c1, r.c2)
            for r in got.itertuples()}


def test_setsim_random_brute(ray_session):
    rng = np.random.default_rng(17)
    baskets = {}
    for i in range(120):
        sz = rng.integers(2, 9)
        baskets[i] = set(rng.choice(40, size=sz, replace=False).tolist())
    # plant guaranteed near-dups
    baskets[200] = set(baskets[0])
    baskets[201] = set(baskets[0]) | {39}
    for tau in ((1, 2), (3, 4), (1, 3)):
        want = _brute(baskets, *tau)
        got = _run(baskets, *tau)
        assert got == want, (tau, len(got), len(want))
        assert len(want) > 0


def test_setsim_exact_dups_and_disjoint(ray_session):
    baskets = {1: {10, 11}, 2: {10, 11}, 3: {20, 21}, 4: {30}}
    got = _run(baskets, 1, 1)  # tau = 1.0: only exact duplicates
    assert got == {(1, 2): (2, 2, 2)}


def test_setsim_empty_result(ray_session):
    baskets = {1: {1}, 2: {2}, 3: {3}}
    got = _run(baskets, 1, 2)
    assert got == {}


def test_ngram_explode_brute():
    texts = ["a b c d e f", "x y", "p q r s t", "", "one two three "
             "four five six seven"]
    batch = pa.table({"doc_id": pa.array(range(len(texts)),
                                         type=pa.int64()),
                      "text": pa.array(texts)})
    got = ngram_explode(batch, 5)
    want = []
    for i, t in enumerate(texts):
        ws = t.split(" ")
        for j in range(len(ws) - 4):
            want.append((i, " ".join(ws[j:j + 5])))
    assert list(zip(got["doc_id"].to_pylist(),
                    got["gram"].to_pylist())) == want
    # short docs must not leak positions into their neighbours
    assert all(g.count(" ") == 4 for g in got["gram"].to_pylist())


def test_ngram_explode_sliced_offsets():
    texts = ["a b c d e", "f g h i j k"]
    batch = pa.table({"doc_id": pa.array([7, 8], type=pa.int64()),
                      "text": pa.array(texts)})
    sliced = batch.slice(1)  # nonzero base offset in the ListArray
    got = ngram_explode(sliced, 3)
    assert got["gram"].to_pylist() == ["f g h", "g h i", "h i j",
                                       "i j k"]
    assert got["doc_id"].to_pylist() == [8, 8, 8, 8]


def test_setsim_hot_token_guard(ray_session, monkeypatch):
    import engine.ops.setsim as ss

    monkeypatch.setattr(ss, "HOT_TOKEN_CAP", 10)
    # 30 sets share rare token 999 → every prefix holds it → guard fires
    baskets = {i: {999, 1000 + i} for i in range(30)}
    import pytest as _pytest

    with _pytest.raises(Exception) as exc:
        _run(baskets, 1, 2)
    assert "HOT_TOKEN_CAP" in str(exc.value) or "prefix token" in str(
        exc.value)
