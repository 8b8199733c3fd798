"""Brute-force parity for the dissolve/OHLC/xcorr/simpson query batch
(each also oracle-checked at sf0.001 and sf0.01 via tools/check_oracle)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _to_table(res):
    if isinstance(res, pa.Table):
        return res
    return pa.concat_tables(list(res.iter_batches(batch_format="pyarrow")))


def _write_events(tmp_path, n=4000, seed=7):
    rng = np.random.default_rng(seed)
    eid = rng.permutation(np.arange(1, n + 1)).astype(np.int64)
    base = np.datetime64("2024-03-01T00:00:00", "us").astype(np.int64)
    ts = base + rng.integers(0, 12 * 86_400_000_000, size=n)
    types = np.array(["click", "view", "purchase", "signup", "error"])
    et = types[rng.integers(0, 5, n)]
    df = pd.DataFrame({
        "event_id": eid,
        "ts": ts.view("datetime64[us]"),
        "user_id": rng.integers(0, 37, n).astype(np.int64),
        "event_type": et,
        "value": rng.uniform(0.0, 900.0, n),
    })
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "events.parquet"))
    return df


def test_region_dissolve_matches_cell_count(ray_session, tmp_path):
    from __ray_entry__ import _q_region_dissolve

    df = _write_events(tmp_path)
    t = _to_table(_q_region_dissolve(str(tmp_path))).to_pandas()
    eid = df["event_id"].to_numpy()
    region = eid % 6
    x0 = eid % 24
    y0 = (eid // 24) % 20
    w = 1 + (x0 + y0) % 3
    h = 1 + (x0 * 3 + y0) % 5
    for r in range(6):
        m = region == r
        boxes = set(zip(x0[m], y0[m]))
        cov = set()
        for bx, by in boxes:
            bw = 1 + (bx + by) % 3
            bh = 1 + (bx * 3 + by) % 5
            for cx in range(bx, bx + bw):
                for cy in range(by, by + bh):
                    cov.add((cx, cy))
        row = t[t["region"] == r].iloc[0]
        assert row["n_boxes"] == len(boxes)
        assert row["union_area"] == len(cov)
    # the synthetic layout must actually overlap for the test to bite
    assert (t["union_area"] < t["n_boxes"] * 15).all()


def test_ohlc_daily_brute(ray_session, tmp_path):
    from __ray_entry__ import _q_ohlc_daily

    df = _write_events(tmp_path)
    t = (_to_table(_q_ohlc_daily(str(tmp_path))).to_pandas()
         .sort_values("day", ignore_index=True))
    d = pd.DataFrame({
        "day": df["ts"].to_numpy().view("int64") // 86_400_000_000,
        "ts": df["ts"].to_numpy().view("int64"),
        "eid": df["event_id"],
        "cents": np.floor(df["value"].to_numpy() * 100.0).astype(np.int64),
    }).sort_values(["day", "ts", "eid"], ignore_index=True)
    g = d.groupby("day")["cents"]
    want = pd.DataFrame({
        "day": g.first().index.to_numpy(),
        "open_cents": g.first().to_numpy(),
        "high_cents": g.max().to_numpy(),
        "low_cents": g.min().to_numpy(),
        "close_cents": g.last().to_numpy(),
    })
    pd.testing.assert_frame_equal(t, want)


def test_xcorr_lag_brute(ray_session, tmp_path):
    from __ray_entry__ import _q_xcorr_lag

    df = _write_events(tmp_path)
    t = (_to_table(_q_xcorr_lag(str(tmp_path))).to_pandas()
         .sort_values("lag", ignore_index=True))
    day = df["ts"].to_numpy().view("int64") // 86_400_000_000
    et = df["event_type"].to_numpy()
    m = (et == "click") | (et == "purchase")
    lo, hi = day[m].min(), day[m].max()
    x = np.zeros(hi - lo + 1, dtype=np.int64)
    y = np.zeros(hi - lo + 1, dtype=np.int64)
    for d, e in zip(day, et):
        if e == "click":
            x[d - lo] += 1
        elif e == "purchase":
            y[d - lo] += 1
    for k in range(8):
        want = int(x[: len(x) - k] @ y[k:]) if k < len(x) else 0
        assert t["dot"][k] == want, k


def test_simpson_diversity_brute(ray_session, tmp_path):
    from __ray_entry__ import _q_simpson_diversity

    df = _write_events(tmp_path)
    t = (_to_table(_q_simpson_diversity(str(tmp_path))).to_pandas()
         .sort_values("user_id", ignore_index=True))
    c = df.groupby(["user_id", "event_type"]).size()
    for u, sub in c.groupby(level=0):
        n = int(sub.sum())
        s = int((sub * sub).sum())
        row = t[t["user_id"] == u].iloc[0]
        assert row["n_events"] == n
        assert row["simpson"] == float(n * n - s) / float(n * n)
    assert len(t) == df["user_id"].nunique()
