"""Brute-force parity for batch R: z-score standardization and n-gram
novelty."""

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


def test_zscore_brute(ray_session, tmp_path):
    from __ray_entry__ import _q_zscore_normalize

    import math

    rng = np.random.default_rng(3)
    n = 3000
    val = np.round(rng.uniform(-20, 120, size=n), 2)
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(np.zeros(n, dtype=np.int64)
                       .view("datetime64[us]")),
        "user_id": pa.array(np.zeros(n, dtype=np.int64)),
        "event_type": pa.array(["x"] * n),
        "value": pa.array(val),
        "props": pa.array(["{}"] * n),
    }), str(tmp_path / "events.parquet"))

    got = _to_table(_q_zscore_normalize(str(tmp_path))).to_pandas()
    got = got.sort_values("event_id", ignore_index=True)
    c = np.rint(val * 100).astype(np.int64)
    s, ss = int(c.sum()), int((c.astype(object) ** 2).sum())
    denom = math.sqrt(float(n * ss - s * s))
    want = (n * c - s).astype(np.float64) / denom
    assert np.array_equal(got["z"].to_numpy(), want)
    # standardization sanity: mean ≈ 0, unit population variance
    assert abs(want.mean()) < 1e-12
    assert abs((want ** 2).mean() - 1.0) < 1e-9


def test_ngram_novelty_brute(ray_session, tmp_path):
    from __ray_entry__ import _q_ngram_novelty

    base = "one two three four five six seven eight nine ten"
    texts = [
        base,                                  # shares grams with copy
        base,                                  # exact copy → novelty 0
        "alpha beta gamma delta epsilon zeta eta",  # fully unique
        base + " eleven twelve",               # extension: mostly shared
    ]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * len(texts)),
        "source": pa.array(["s"] * len(texts)),
        "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
    }), str(tmp_path / "documents.parquet"))

    got = _to_table(_q_ngram_novelty(str(tmp_path))).to_pandas()
    got = got.sort_values("doc_id", ignore_index=True)

    # brute
    def grams(t):
        ws = t.split(" ")
        return {" ".join(ws[i:i + 5]) for i in range(len(ws) - 4)}

    gsets = [grams(t) for t in texts]
    from collections import Counter
    dfc = Counter(g for gs in gsets for g in gs)
    for i, gs in enumerate(gsets):
        nu = sum(dfc[g] == 1 for g in gs)
        assert got["n_grams"][i] == len(gs)
        assert got["n_unique"][i] == nu
        assert got["novelty"][i] == float(nu) / float(len(gs))
    assert got["novelty"][0] == 0.0 and got["novelty"][1] == 0.0
    assert got["novelty"][2] == 1.0
    assert 0.0 < got["novelty"][3] < 1.0
