"""Brute-force parity for the ACF/Theil-Sen/shape-stats/Benford batch
(each also oracle-checked at sf0.001 and sf0.01 via tools/check_oracle)."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _to_table(res):
    if isinstance(res, pa.Table):
        return res
    return pa.concat_tables(list(res.iter_batches(batch_format="pyarrow")))


def _write_events(tmp_path, n=4000, seed=31):
    rng = np.random.default_rng(seed)
    base = np.datetime64("2024-06-01T00:00:00", "us").astype(np.int64)
    day = rng.integers(0, 25, n)
    df = pd.DataFrame({
        "event_id": np.arange(1, n + 1, dtype=np.int64),
        "ts": (base + day * 86_400_000_000
               + rng.integers(0, 86_400_000_000, n)).view("datetime64[us]"),
        "user_id": rng.integers(0, 29, n).astype(np.int64),
        "event_type": np.array(["click", "view", "purchase"])[
            rng.integers(0, 3, n)],
        # lognormal-ish so skewness/kurtosis/Benford are nontrivial
        "value": np.exp(rng.normal(3.0, 1.2, n)),
    })
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "events.parquet"))
    return df


def _dense_counts(df):
    day = df["ts"].to_numpy().view("int64") // 86_400_000_000
    lo, hi = day.min(), day.max()
    dense = np.zeros(hi - lo + 1, dtype=np.int64)
    for d in day:
        dense[d - lo] += 1
    return dense


def test_acf_table_brute(ray_session, tmp_path):
    from __ray_entry__ import _q_acf_table

    df = _write_events(tmp_path)
    t = _to_table(_q_acf_table(str(tmp_path))).to_pandas()
    dense = _dense_counts(df)
    for _, row in t.iterrows():
        k = int(row["lag"])
        want = np.corrcoef(dense[:-k], dense[k:])[0, 1]
        assert abs(row["acf"] - want) < 1e-12, k
    assert t["lag"].tolist() == list(range(1, 15))


def test_theil_sen_brute(ray_session, tmp_path):
    from __ray_entry__ import _q_theil_sen

    df = _write_events(tmp_path)
    t = _to_table(_q_theil_sen(str(tmp_path)))
    dense = _dense_counts(df)
    slopes = sorted(
        (dense[j] - dense[i]) / (j - i)
        for i in range(len(dense)) for j in range(i + 1, len(dense)))
    m = len(slopes)
    want = (slopes[m // 2] if m % 2
            else (slopes[m // 2 - 1] + slopes[m // 2]) / 2.0)
    assert t["n_pairs"][0].as_py() == m
    assert t["slope"][0].as_py() == want


def test_value_shape_stats_brute(ray_session, tmp_path):
    from __ray_entry__ import _q_value_shape_stats

    df = _write_events(tmp_path)
    t = (_to_table(_q_value_shape_stats(str(tmp_path))).to_pandas()
         .set_index("event_type"))
    d = df.copy()
    d["c"] = np.floor(d["value"].to_numpy() * 100.0).astype(np.int64)
    for et, sub in d.groupby("event_type"):
        c = [int(v) for v in sub["c"]]
        n = len(c)
        s1, s2 = sum(c), sum(v * v for v in c)
        s3 = sum(v ** 3 for v in c)
        s4 = sum(v ** 4 for v in c)
        m2 = n * s2 - s1 * s1
        m3 = n * n * s3 - 3 * n * s1 * s2 + 2 * s1 ** 3
        m4 = (n ** 3 * s4 - 4 * n * n * s1 * s3
              + 6 * n * s1 * s1 * s2 - 3 * s1 ** 4)
        row = t.loc[et]
        assert row["n"] == n
        assert row["skew"] == float(m3) / (float(m2) * math.sqrt(float(m2)))
        assert row["kurtosis"] == float(m4) / (float(m2) * float(m2)) - 3.0
        # the lognormal construction must be genuinely right-skewed
        assert row["skew"] > 0.5


def test_benford_digits_brute(ray_session, tmp_path):
    from __ray_entry__ import _q_benford_digits

    df = _write_events(tmp_path)
    t = (_to_table(_q_benford_digits(str(tmp_path))).to_pandas()
         .sort_values("digit", ignore_index=True))
    c = np.floor(df["value"].to_numpy() * 100.0).astype(np.int64)
    c = c[c > 0]
    want = {}
    for v in c:
        d = int(str(int(v))[0])
        want[d] = want.get(d, 0) + 1
    got = dict(zip(t["digit"], t["n"]))
    assert got == want
    assert set(got) == set(range(1, 10))


def test_degenerate_inputs_match_oracle_semantics(ray_session, tmp_path):
    """Review regressions: single-day calendars, missing event types and
    constant/singleton groups must follow the SQL oracle's semantics
    (zero rows / NULLs), not crash."""
    from __ray_entry__ import (_q_cusum_changepoint, _q_ohlc_daily,
                               _q_theil_sen, _q_value_shape_stats,
                               _q_xcorr_lag)

    base = np.datetime64("2024-07-01T00:00:00", "us").astype(np.int64)
    # all events on ONE day; one singleton type, one constant type, and
    # NO click/purchase rows at all
    df = pd.DataFrame({
        "event_id": np.arange(1, 6, dtype=np.int64),
        "ts": (base + np.arange(5) * 3_600_000_000).view("datetime64[us]"),
        "user_id": np.zeros(5, dtype=np.int64),
        "event_type": ["view", "view", "view", "signup", "error"],
        "value": [5.0, 5.0, 5.0, 7.0, 9.0],
    })
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "events.parquet"))

    t = _to_table(_q_theil_sen(str(tmp_path)))
    assert t["n_pairs"][0].as_py() == 0
    assert t["slope"][0].as_py() is None

    assert _to_table(_q_cusum_changepoint(str(tmp_path))).num_rows == 0

    t = _to_table(_q_xcorr_lag(str(tmp_path))).to_pandas()
    assert t["lag"].tolist() == list(range(8))
    assert t["dot"].tolist() == [0] * 8

    t = (_to_table(_q_value_shape_stats(str(tmp_path))).to_pandas()
         .set_index("event_type"))
    for et in ("signup", "error", "view"):  # singleton / constant groups
        assert np.isnan(t.loc[et]["skew"])
        assert np.isnan(t.loc[et]["kurtosis"])

    t = _to_table(_q_ohlc_daily(str(tmp_path)))
    assert t.num_rows == 1  # one day, fold handles the single-day case
    assert t["open_cents"][0].as_py() == 500
    assert t["close_cents"][0].as_py() == 900
