"""Brute-force parity for the Kaplan-Meier hazard table, including
censoring."""

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


def test_survival_hazard_brute(ray_session, tmp_path):
    from __ray_entry__ import _q_survival_hazard

    rng = np.random.default_rng(3)
    DAY = 86_400_000_000
    rows = []
    eid = 0
    for u in range(60):
        t0 = int(rng.integers(0, 5 * DAY))
        rows.append((eid, t0, u, "click"))
        eid += 1
        # half the users purchase 0..9 days later; some purchase
        # BEFORE their first click (must not count)
        if u % 4 == 0:
            rows.append((eid, max(0, t0 - 2 * DAY), u, "purchase"))
            eid += 1
        if u % 2 == 0:
            rows.append((eid, t0 + int(rng.integers(0, 10)) * DAY
                         + 1000, u, "purchase"))
            eid += 1
        # background noise events define the horizon
        rows.append((eid, int(rng.integers(0, 20 * DAY)), u, "view"))
        eid += 1
    rows.append((eid, 25 * DAY, 999, "view"))  # horizon anchor
    n = len(rows)
    pq.write_table(pa.table({
        "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "ts": pa.array(np.array([r[1] for r in rows], dtype=np.int64)
                       .view("datetime64[us]")),
        "user_id": pa.array([r[2] for r in rows], type=pa.int64()),
        "event_type": pa.array([r[3] for r in rows]),
        "value": pa.array(np.zeros(n)),
        "props": pa.array(["{}"] * n),
    }), str(tmp_path / "events.parquet"))

    got = _to_table(_q_survival_hazard(str(tmp_path))).to_pandas()
    got = got.sort_values("day", ignore_index=True)

    df = pd.DataFrame(rows, columns=["e", "ts", "u", "t"])
    horizon = int(df["ts"].max())
    per = {}
    for u, sub in df.groupby("u"):
        clicks = sub[sub["t"] == "click"]["ts"]
        if len(clicks) == 0:
            continue
        fc = int(clicks.min())
        purch = sub[(sub["t"] == "purchase") & (sub["ts"] >= fc)]["ts"]
        if len(purch):
            per[u] = ((int(purch.min()) - fc) // DAY, 1)
        else:
            per[u] = ((horizon - fc) // DAY, 0)
    tab = {}
    for t, ev in per.values():
        d, tot = tab.get(t, (0, 0))
        tab[t] = (d + ev, tot + 1)
    days = sorted(tab)
    want_risk = {}
    for t in days:
        want_risk[t] = sum(tot for s, (_, tot) in tab.items()
                           if s >= t)
    assert got["day"].tolist() == days
    assert got["n_event"].tolist() == [tab[t][0] for t in days]
    assert got["n_risk"].tolist() == [want_risk[t] for t in days]
    for i, t in enumerate(days):
        assert got["hazard"][i] == float(tab[t][0]) / float(
            want_risk[t])
    # censoring actually exercised
    assert any(ev == 0 for _, ev in per.values())
    assert any(ev == 1 for _, ev in per.values())
