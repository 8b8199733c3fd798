"""Brute-force parity for batch N: seasonal-naive backtest and
source-vocabulary overlap."""

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


def test_seasonal_naive_brute(ray_session, tmp_path):
    from __ray_entry__ import _q_seasonal_naive_error

    rng = np.random.default_rng(5)
    n = 5000
    # 40-day span with weekly structure + gap days
    day = rng.choice(np.arange(40), size=n,
                     p=(lambda w: w / w.sum())(
                         np.where(np.arange(40) % 7 < 5, 3.0, 1.0)
                         * np.where(np.arange(40) % 9 == 0, 0.0, 1.0)
                         + 1e-9))
    ts = day.astype(np.int64) * 86_400_000_000 + rng.integers(
        0, 86_400_000_000, size=n)
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts.view("datetime64[us]")),
        "user_id": pa.array(np.zeros(n, dtype=np.int64)),
        "event_type": pa.array(["x"] * n),
        "value": pa.array(np.zeros(n)),
        "props": pa.array(["{}"] * n),
    }), str(tmp_path / "events.parquet"))

    got = _to_table(_q_seasonal_naive_error(str(tmp_path)))

    days = ts // 86_400_000_000
    lo, hi = int(days.min()), int(days.max())
    dense = np.zeros(hi - lo + 1, dtype=np.int64)
    for d in days:
        dense[d - lo] += 1
    err = dense[7:] - dense[:-7]
    assert got["n_days"][0].as_py() == len(err)
    assert got["abs_err"][0].as_py() == int(np.abs(err).sum())
    assert got["bias"][0].as_py() == int(err.sum())
    assert got["mae"][0].as_py() == float(np.abs(err).sum()) / len(err)


def test_source_vocab_overlap_brute(ray_session, tmp_path):
    from __ray_entry__ import _q_source_vocab_overlap

    rng = np.random.default_rng(13)
    vocab = [f"w{i}" for i in range(60)]
    rows = []
    for i in range(90):
        src = f"s{i % 4}"
        words = rng.choice(vocab[: 20 + 10 * (i % 4)],
                           size=rng.integers(5, 15))
        rows.append((i, " ".join(words), src))
    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "text": pa.array([r[1] for r in rows]),
        "lang": pa.array(["en"] * len(rows)),
        "source": pa.array([r[2] for r in rows]),
        "n_chars": pa.array([len(r[1]) for r in rows],
                            type=pa.int64()),
    }), str(tmp_path / "documents.parquet"))

    got = _to_table(_q_source_vocab_overlap(str(tmp_path))).to_pandas()
    got = got.sort_values(["source_a", "source_b"], ignore_index=True)

    vs = {}
    for _, text, src in rows:
        vs.setdefault(src, set()).update(text.split(" "))
    keys = sorted(vs)
    want = []
    for i, a in enumerate(keys):
        for b in keys[i + 1:]:
            inter = len(vs[a] & vs[b])
            if inter:
                want.append((a, b, inter, len(vs[a]), len(vs[b]),
                             float(inter) / (len(vs[a]) + len(vs[b])
                                             - inter)))
    got_t = list(zip(got["source_a"], got["source_b"], got["inter"],
                     got["va"], got["vb"], got["jaccard"]))
    assert got_t == want
    assert len(want) == 6  # all 4×3/2 pairs overlap in this corpus
