"""Parity tests for batch J: grouped HLL accuracy, cell adjacency
brute force, hive-partitioned roundtrip losslessness."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data

from engine.ops.sketch import grouped_hll_distinct


def _to_table(res):
    if isinstance(res, ray.data.Dataset):
        return pa.concat_tables(
            [b for b in res.iter_batches(batch_format="pyarrow")])
    return res


def test_grouped_hll_accuracy(ray_session):
    rng = np.random.default_rng(3)
    n = 60_000
    g = rng.choice(["a", "b", "c"], size=n, p=[0.6, 0.3, 0.1])
    # very different true cardinalities per group
    v = np.where(g == "a", rng.integers(0, 20_000, size=n),
                 np.where(g == "b", rng.integers(0, 900, size=n),
                          rng.integers(0, 37, size=n)))
    ds = ray.data.from_arrow(pa.table({
        "g": pa.array(g.tolist()), "v": pa.array(v.astype(np.int64)),
    })).repartition(8)
    got = grouped_hll_distinct(ds, "g", "v").to_pandas() \
        .set_index("g")["approx_distinct"]
    import pandas as pd

    truth = pd.DataFrame({"g": g, "v": v}).groupby("g")["v"].nunique()
    for k in ("a", "b", "c"):
        rel = abs(got[k] - truth[k]) / truth[k]
        assert rel < 0.06, (k, got[k], truth[k])


def test_grouped_hll_merge_equals_single(ray_session):
    rng = np.random.default_rng(9)
    v = rng.integers(0, 5000, size=20_000).astype(np.int64)
    g = np.array(["x"] * len(v))
    one = grouped_hll_distinct(ray.data.from_arrow(pa.table({
        "g": pa.array(g.tolist()), "v": pa.array(v)})), "g", "v")
    many = grouped_hll_distinct(ray.data.from_arrow(pa.table({
        "g": pa.array(g.tolist()), "v": pa.array(v)})).repartition(13),
        "g", "v")
    # register merge is exact: partitioning must not change the sketch
    assert one["approx_distinct"][0].as_py() == \
        many["approx_distinct"][0].as_py()


def test_cell_adjacency_brute(ray_session):
    from __ray_entry__ import _q_cell_adjacency

    sf = "/root/testdata/sf0.001"
    got = _to_table(_q_cell_adjacency(sf)).to_pandas()
    pairs = set(zip(got["cell_a"], got["cell_b"]))

    from engine.rayds import pipeline

    enc = pipeline.encoded_dataset(sf).select_columns(["cell"])
    cells = set()
    for b in enc.iter_batches(batch_format="pyarrow"):
        cells.update(b["cell"].to_pylist())
    want = set()
    for c in cells:
        for step in (1 << 20, 1):
            if c + step in cells:
                want.add((c, c + step))
    assert pairs == want
    assert len(want) > 100


def test_hive_roundtrip_partition_dirs(ray_session, tmp_path):
    from __ray_entry__ import _q_hive_partition_roundtrip

    sf = "/root/testdata/sf0.001"
    got = _to_table(_q_hive_partition_roundtrip(sf)).to_pandas()
    # the sink actually produced one directory per type
    import os

    dirs = sorted(d for d in os.listdir("/tmp/graft_hive_events")
                  if d.startswith("event_type="))
    assert "event_type=purchase" in dirs and len(dirs) == 5
    # and the pruned read aggregates only the purchase slice
    import duckdb

    want = duckdb.sql(f"""
        SELECT user_id, count(*) n,
               sum(CAST(round(value*100) AS BIGINT)) s
        FROM '{sf}/events.parquet' WHERE event_type='purchase'
        GROUP BY 1 ORDER BY 1""").df()
    got = got.sort_values("user_id", ignore_index=True)
    assert got["user_id"].tolist() == want["user_id"].tolist()
    assert got["n"].tolist() == want["n"].tolist()
    assert got["sum_cents"].tolist() == want["s"].tolist()


def test_zorder_locality_improves(ray_session):
    from __ray_entry__ import _q_zorder_locality

    t = _to_table(_q_zorder_locality("/root/testdata/sf0.001")) \
        .to_pandas().set_index("layout")
    arr = t.loc["arrival", "mean_bbox_area"]
    mor = t.loc["morton", "mean_bbox_area"]
    assert t.loc["morton", "n_blocks"] >= 1
    # the Morton layout must tighten per-block spatial locality a lot
    assert mor < 0.6 * arr, (mor, arr)


def test_region_simplify_stats(ray_session):
    from __ray_entry__ import _q_region_simplify_stats

    t = _to_table(_q_region_simplify_stats("/root/testdata/sf0.001")) \
        .to_pandas()
    assert len(t) == 512
    assert (t["n_after"] * 2 <= t["n_before"]).all()  # ≥2× reduction
    assert ((t["area_ratio"] >= 0.9) & (t["area_ratio"] <= 1.0)).all()
    assert t["valid"].all()
