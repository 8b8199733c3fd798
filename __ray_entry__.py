"""Driver contract: entry() / queries() / oracle_sql().

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in ``engine``) calls ``ray.init``/``ray.shutdown``.

The geospatial queries run over the image+caption table DERIVED
deterministically from ``events`` (engine/rayds/imagetab.py) joined with
a 30-box polygon layer derived from ``nation``+``region`` — the same
integer/IEEE arithmetic is emitted as SQL so DuckDB reproduces join and
tile results exactly.  General-polygon predicate correctness (beyond the
oracle-expressible boxes) is covered by the shapely-conformance pytest
corpus (tests/test_predicates.py, tests/test_strtree_conformance.py).
"""

from __future__ import annotations

import math
import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import pyarrow as pa

# Driver-fold budget for vocabulary-sized partials (lift_pairs,
# degree_assortativity, spearman): past it the retained distributed
# join plans apply.  Module-level so tests can force the fallbacks.
_FOLD_BUDGET = 20_000_000

from engine.rayds.imagetab import SQL_IMAGES, SQL_LAYER

_IMGS = f"imgs AS ({SQL_IMAGES})"
_LAYER = f"layer AS ({SQL_LAYER})"
_COVERS = "x >= xmin AND x <= xmax AND y >= ymin AND y <= ymax"
_CONTAINS = "x > xmin AND x < xmax AND y > ymin AND y < ymax"
_TILE = (
    "CAST(least(floor((y - ymin) / (side / 4)), 3) AS BIGINT) * 4 + "
    "CAST(least(floor((x - xmin) / (side / 4)), 3) AS BIGINT)"
)
_DW = (
    "(greatest(xmin - x, x - xmax, 0) * greatest(xmin - x, x - xmax, 0) + "
    "greatest(ymin - y, y - ymax, 0) * greatest(ymin - y, y - ymax, 0)) <= 2.25"
)


def entry() -> Any:
    """Flagship: read sf0.001 → cell encode → two-phase join → tiling."""
    from engine.rayds import pipeline

    return pipeline.tiles_dataset("/root/testdata/sf0.001")


# --------------------------------------------------------------- geo queries
def _q_cell_counts(sf_dir):
    from engine.rayds import pipeline, shuffle

    enc = pipeline.encoded_dataset(sf_dir).select_columns(["cell"])
    return shuffle.grouped_count(enc, ["cell"], out_col="n_images")


def _q_join_covers(sf_dir):
    from engine.rayds import pipeline

    return pipeline.pairs_dataset(sf_dir, "covers").select_columns(
        ["image_id", "poly_id"]
    )


def _q_join_contains(sf_dir):
    from engine.rayds import pipeline

    return pipeline.pairs_dataset(sf_dir, "contains").select_columns(
        ["image_id", "poly_id"]
    )


def _q_tile_assign(sf_dir):
    from engine.rayds import pipeline

    return pipeline.tiles_dataset(sf_dir).select_columns(
        ["image_id", "poly_id", "tile_id"]
    )


def _q_tile_counts(sf_dir):
    from engine.rayds import pipeline

    return pipeline.tile_counts(sf_dir, salted=True)


def _q_dwithin(sf_dir):
    from engine.rayds import pipeline

    return pipeline.dwithin_dataset(sf_dir, 1.5).select_columns(
        ["image_id", "poly_id"]
    )


def _q_knn_centers(sf_dir):
    from engine.rayds import pipeline

    return pipeline.knn_centers_dataset(sf_dir).select_columns(
        ["image_id", "poly_id"]
    )


def _q_total_bounds(sf_dir):
    from engine.rayds.imagetab import image_dataset
    from engine.rayds.shuffle import dataset_minmax

    mm = dataset_minmax(image_dataset(sf_dir), ["x", "y"])
    return pa.table(
        {
            "xmin": [mm["x"][0]],
            "xmax": [mm["x"][1]],
            "ymin": [mm["y"][0]],
            "ymax": [mm["y"][1]],
        }
    )


def _q_layer_measures(sf_dir):
    from engine.rayds.imagetab import load_layer

    layer = load_layer(sf_dir)
    return pa.table(
        {
            "poly_id": pa.array(layer.poly_ids),
            "area": pa.array(layer.polys.area()),
            "perimeter": pa.array(layer.polys.perimeter()),
        }
    )


def _q_semi_join(sf_dir):
    from engine.rayds import pipeline

    return pipeline.semi_anti_ids(sf_dir, anti=False)


def _q_anti_join(sf_dir):
    from engine.rayds import pipeline

    return pipeline.semi_anti_ids(sf_dir, anti=True)


def _q_wkb_roundtrip(sf_dir):
    """Vectorized WKB encode→decode of the point column (serialization
    family, SURVEY §2.1); must reproduce x/y bit-exactly."""
    from engine.rayds.geo_stages import wkb_point_decode, wkb_point_encode
    from engine.rayds.imagetab import image_dataset

    return (
        image_dataset(sf_dir)
        .map_batches(wkb_point_encode, batch_format="pyarrow", batch_size=None)
        .map_batches(wkb_point_decode, batch_format="pyarrow", batch_size=None)
        .select_columns(["image_id", "x", "y"])
    )


def _q_wkbz_roundtrip(sf_dir):
    """POINT Z WKB encode→decode over a derived elevation column — the
    Z-coordinate path through the DATA PLANE (bit-exact x/y/z oracle)."""
    from engine.rayds.geo_stages import wkb_pointz_decode, wkb_pointz_encode
    from engine.rayds.imagetab import image_dataset

    def add_z(batch: pa.Table) -> pa.Table:
        x = batch["x"].to_numpy()
        y = batch["y"].to_numpy()
        return batch.append_column("z", pa.array((x + y) / 2.0))

    return (
        image_dataset(sf_dir)
        .map_batches(add_z, batch_format="pyarrow", batch_size=None)
        .map_batches(wkb_pointz_encode, batch_format="pyarrow", batch_size=None)
        .map_batches(wkb_pointz_decode, batch_format="pyarrow", batch_size=None)
        .select_columns(["image_id", "x", "y", "z"])
    )


def _q_affine_bounds(sf_dir):
    """Affine transform stage (x+10.5, 2·y) then total-bounds aggregate
    (affinity family §2.13 + aggregate §2.6)."""
    from engine.rayds.geo_stages import affine_xy
    from engine.rayds.imagetab import image_dataset
    from engine.rayds.shuffle import dataset_minmax

    ds = image_dataset(sf_dir).map_batches(
        affine_xy(e=2.0, xoff=10.5), batch_format="pyarrow", batch_size=None
    )
    mm = dataset_minmax(ds, ["x", "y"])
    return pa.table(
        {
            "xmin": [mm["x"][0]],
            "xmax": [mm["x"][1]],
            "ymin": [mm["y"][0]],
            "ymax": [mm["y"][1]],
        }
    )


def _q_tile_clip_area(sf_dir):
    """clip_by_rect kernel (constructive.py:380) over every layer-tile
    rect against the window (10,10)-(60,60), as a Dataset pipeline: the
    (poly, tile) grid is exploded driver-side (small) and the clip runs
    inside map_batches; oracle recomputes with rectangle-intersection
    arithmetic."""
    import ray.data

    from engine.rayds.imagetab import TILE_N, load_layer

    layer = load_layer(sf_dir)
    n = len(layer.poly_ids)
    tid = np.arange(TILE_N * TILE_N, dtype=np.int64)
    grid = pa.table(
        {
            "poly_id": pa.array(np.repeat(layer.poly_ids, len(tid))),
            "tile_id": pa.array(np.tile(tid, n)),
            "xmin": pa.array(np.repeat(layer.bounds[:, 0], len(tid))),
            "ymin": pa.array(np.repeat(layer.bounds[:, 1], len(tid))),
            "side4": pa.array(np.repeat(layer.sides / TILE_N, len(tid))),
        }
    )

    def clip_batch(batch: pa.Table) -> pa.Table:
        from engine.geo.constructive import clip_by_rect
        from engine.geo.geom import Geom
        from engine.geo.measure import area as geo_area

        tids = batch["tile_id"].to_numpy()
        tx = tids % TILE_N
        ty = tids // TILE_N
        x0 = batch["xmin"].to_numpy() + tx * batch["side4"].to_numpy()
        y0 = batch["ymin"].to_numpy() + ty * batch["side4"].to_numpy()
        s = batch["side4"].to_numpy()
        # axis-aligned box ∩ rect is interval arithmetic — vectorized;
        # a deterministic row sample cross-checks the general
        # clip_by_rect kernel so the geometry path stays exercised
        w = np.clip(np.minimum(x0 + s, 60.0) - np.maximum(x0, 10.0), 0, None)
        h = np.clip(np.minimum(y0 + s, 60.0) - np.maximum(y0, 10.0), 0, None)
        areas = w * h
        for i in range(0, len(batch), max(1, len(batch) // 16)):
            clipped = clip_by_rect(
                Geom.box(x0[i], y0[i], x0[i] + s[i], y0[i] + s[i]),
                10.0, 10.0, 60.0, 60.0,
            )
            kernel = 0.0 if clipped.is_empty else float(geo_area(clipped))
            assert abs(kernel - areas[i]) <= 1e-9, (kernel, areas[i])
        return pa.table(
            {
                "poly_id": batch["poly_id"],
                "tile_id": batch["tile_id"],
                "clip_area": pa.array(areas),
            }
        )

    return ray.data.from_arrow(grid).map_batches(
        clip_batch, batch_format="pyarrow", batch_size=None
    )


def _q_join_covers_cellpart(sf_dir):
    """Same join as join_covers through the BIG-BIG physical plan:
    co-partition both sides by cell (shuffle equi-join + per-group
    refinement + pair dedupe) instead of broadcasting the layer."""
    from engine.rayds.celljoin import cellpart_pairs

    return cellpart_pairs(sf_dir)


def _q_join_covers_s2part(sf_dir):
    """Same join as join_covers, SHUFFLED ON S2 CELL IDS — the north
    rule's S2 index as an actual partition key (exact cover via the
    snapped-quantizer construction, celljoin.py)."""
    from engine.rayds.celljoin import s2part_pairs

    return s2part_pairs(sf_dir)


def _q_join_covers_hexpart(sf_dir):
    """Same join as join_covers, SHUFFLED ON HEX (H3-style res-7) IDS."""
    from engine.rayds.celljoin import hexpart_pairs

    return hexpart_pairs(sf_dir)


def _q_join_covers_h3part(sf_dir):
    """Same join, SHUFFLED ON SPHERICAL ICOSAHEDRAL HEX IDS — the
    aperture-7 H3-class index (engine.geo.hexsphere: gnomonic face
    projection, Eisenstein-integer digit hierarchy, H3-style bit
    layout; orientation self-derived, see the module's honesty note)."""
    from engine.rayds.celljoin import h3xpart_pairs

    return h3xpart_pairs(sf_dir)


def _q_join_overlaps_range(sf_dir):
    """RANGE JOIN: image footprints (squares of half-extent w/512) ×
    polygon bboxes, intersects semantics — the both-sides-exploded cell
    plan with its pair-dedupe exchange."""
    from engine.rayds.celljoin import boxpart_pairs

    return boxpart_pairs(sf_dir)


def _q_window_agg(sf_dir):
    """Tumbling 1-hour WINDOWED AGGREGATE over the raw event stream:
    count + integer-cents value sum per (window, event_type) —
    combiner-first, merged by the engine's own hash shuffle."""
    import ray.data

    from engine.rayds.shuffle import hash_shuffle_agg

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy()  # µs since epoch
        win = ts // 3_600_000_000
        cents = np.floor(batch["value"].to_numpy() * 100.0).astype(np.int64)
        t = pa.table(
            {
                "win": pa.array(win),
                "event_type": batch["event_type"],
                "_n": pa.array(np.ones(len(batch), dtype=np.int64)),
                "_cents": pa.array(cents),
            }
        )
        g = t.group_by(["win", "event_type"]).aggregate(
            [("_n", "sum"), ("_cents", "sum")]
        )
        return g.rename_columns(["win", "event_type", "_n", "_cents"])

    part = ds.map_batches(partial, batch_format="pyarrow", batch_size=None,
                          zero_copy_batch=True)
    merged = hash_shuffle_agg(
        part, ["win", "event_type"], [("_n", "sum"), ("_cents", "sum")],
        ["n_events", "sum_cents"],
    )
    return merged


def _q_asof_click_view(sf_dir):
    """AS-OF join: for every 'click' event, the latest 'view' by the
    same user at-or-before it (hash-partitioned vectorized sweep)."""
    import ray.data

    from engine.ops.asof import asof_join

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "event_type"]
    )
    return asof_join(ds, "click", "view")


def _q_asof_split(sf_dir):
    """Skew-proof AS-OF join: (key, time-bucket) co-partitioning with a
    broadcast per-bucket carry table, so no single key must fit one
    partition (hot-key pre-split; same result as asof_click_view)."""
    import ray.data

    from engine.ops.asof import asof_join_split

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "event_type"]
    )
    return asof_join_split(ds, "click", "view", bucket_us=6 * 3_600_000_000)


def _q_rollup_counts(sf_dir):
    """ROLLUP / GROUPING SETS: event counts at three levels —
    (event_type, hour), (event_type), grand total — as ONE output table
    with '__all__' placeholders for coalesced dimensions.  Each level is
    its own combiner-first grouped count (a rollup of an algebraic
    aggregate never re-reads the input at scale: the finest level's
    partials could be re-folded, but levels here are cheap enough to
    fuse into one pass per level and keep the plan obvious)."""
    import pyarrow.compute as pc
    import ray.data

    from engine.rayds.shuffle import grouped_count

    def with_hour(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64())
        hour = pc.multiply(pc.divide(ts, 3_600_000_000), 3_600_000_000)
        return pa.table({"event_type": batch["event_type"], "hour_us": hour})

    # materialized: three rollup levels consume the same scan — without
    # this, the parquet read + hour projection executes once per level
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"]
    ).map_batches(with_hour, batch_format="pyarrow", batch_size=None,
                  zero_copy_batch=True).materialize()

    fine = grouped_count(ev, ["event_type", "hour_us"], out_col="n")
    # mid is consumed twice (its own level + the grand total) — tiny
    # (one row per event_type), materialize it too
    mid = grouped_count(ev.select_columns(["event_type"]), ["event_type"],
                        out_col="n").materialize()

    def mid_fix(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": batch["event_type"],
            "hour_us": pa.array(np.full(len(batch), -1, dtype=np.int64)),
            "n": batch["n"],
        })

    def tot_fix(batch: pa.Table) -> pa.Table:
        n = pa.compute.sum(batch["n"]).as_py() or 0
        return pa.table({
            "event_type": pa.array(["__all__"]),
            "hour_us": pa.array([-1], type=pa.int64()),
            "n": pa.array([n], type=pa.int64()),
        })

    # grouped_count's tree plan returns a single-block Dataset, so the
    # grand total sees every row without a repartition
    total = mid.map_batches(
        lambda b: b.select(["n"]), batch_format="pyarrow", batch_size=None
    ).map_batches(tot_fix, batch_format="pyarrow", batch_size=None)
    return fine.union(
        mid.map_batches(mid_fix, batch_format="pyarrow", batch_size=None),
        total,
    )


def _q_region_revenue(sf_dir):
    """STAR-SCHEMA enrichment chain (5 tables): lineitem revenue rolled
    up to region name through THREE chained broadcast joins (orders,
    customer, nation⋈region pre-joined driver-side — every dimension
    side fits the broadcast budget, so the fact table streams once and
    NOTHING shuffles until the final tiny grouped sum)."""
    import ray.data

    from engine.rayds.shuffle import equi_join, grouped_agg

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )

    def bp(batch: pa.Table) -> pa.Table:
        v = np.floor(
            batch["l_extendedprice"].to_numpy()
            * (1.0 - batch["l_discount"].to_numpy()) * 10000.0
        ).astype(np.int64)
        return pa.table({"l_orderkey": batch["l_orderkey"],
                         "_bp": pa.array(v)})

    li = li.map_batches(bp, batch_format="pyarrow", batch_size=None,
                        zero_copy_batch=True)
    from engine.rayds.shuffle import dim_table

    # orders/customer GROW with scale → adaptive probe (metadata-count
    # fast path, no execution); nation/region are scale-INVARIANT (25/5
    # rows at every SF) → driver-side dim_table, zero Ray executions
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    nation = dim_table(f"{sf_dir}/nation.parquet",
                       ["n_nationkey", "n_regionkey"])
    region = dim_table(f"{sf_dir}/region.parquet", ["r_regionkey", "r_name"])

    j1 = equi_join(orders, li, "o_orderkey", "l_orderkey",
                   ["o_custkey"], ["_bp"])
    j2 = equi_join(cust, j1, "c_custkey", "o_custkey",
                   ["c_nationkey"], ["_bp"])
    j3 = equi_join(nation, j2, "n_nationkey", "c_nationkey",
                   ["n_regionkey"], ["_bp"])
    j4 = equi_join(region, j3, "r_regionkey", "n_regionkey",
                   ["r_name"], ["_bp"])
    # 5 regions → combiner partial (≤5 rows/block) + tree reduce: the
    # fact stream never enters an all-to-all at any scale
    agg = grouped_agg(j4, ["r_name"], [("_bp", "sum")], ["revenue_bp"],
                      plan="tree")
    return agg.map_batches(
        lambda b: b.select(["r_name", "revenue_bp"]),
        batch_format="pyarrow", batch_size=None,
    )


def _q_q3_topk(sf_dir):
    """TPC-H Q3-shaped THREE-TABLE JOIN CHAIN: customer (segment
    filter) ⋈ orders (date filter) ⋈ lineitem (shipdate filter) →
    grouped revenue (exact basis-point int64) → top-10.  Exercises two
    chained adaptive equi-joins (the filtered customer side fits the
    broadcast budget; orders⋈lineitem takes the hash exchange) plus the
    hash-shuffle aggregate and a distributed sort+limit."""
    import pyarrow.compute as pc
    import ray.data

    from engine.rayds.shuffle import equi_join, grouped_agg

    CUT = 883_612_800_000_000  # 1998-01-01 in epoch µs

    def cust_fn(batch: pa.Table) -> pa.Table:
        m = pc.equal(batch["c_mktsegment"], "BUILDING")
        return batch.filter(m).select(["c_custkey"])

    def orders_fn(batch: pa.Table) -> pa.Table:
        d = batch["o_orderdate"].cast(pa.int64())
        t = batch.append_column("o_date_us", d)
        return t.filter(pc.less(d, CUT)).select(
            ["o_custkey", "o_orderkey", "o_date_us"])

    def li_fn(batch: pa.Table) -> pa.Table:
        sd = batch["l_shipdate"].cast(pa.int64())
        t = batch.filter(pc.greater(sd, CUT))
        bp = np.floor(
            t["l_extendedprice"].to_numpy()
            * (1.0 - t["l_discount"].to_numpy()) * 10000.0
        ).astype(np.int64)
        return pa.table({"l_orderkey": t["l_orderkey"], "_bp": pa.array(bp)})

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    ).map_batches(cust_fn, batch_format="pyarrow", batch_size=None,
                  zero_copy_batch=True)
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderkey", "o_orderdate"],
    ).map_batches(orders_fn, batch_format="pyarrow", batch_size=None,
                  zero_copy_batch=True)
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"],
    ).map_batches(li_fn, batch_format="pyarrow", batch_size=None,
                  zero_copy_batch=True)

    j1 = equi_join(orders, cust, "o_custkey", "c_custkey",
                   ["o_orderkey", "o_date_us"], [])
    j2 = equi_join(j1, li, "o_orderkey", "l_orderkey", ["o_date_us"], ["_bp"])

    # per-block partial combiner before the exchange: the shuffle moves
    # ≤ (distinct orders × blocks) partial rows, not every lineitem row
    agg = grouped_agg(j2, ["_k", "o_date_us"], [("_bp", "sum")],
                      ["revenue_bp"], plan="shuffle")

    def rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["l_orderkey", "o_date_us", "revenue_bp"])

    # exact top-10 via block combiner + one merge block — each reducer
    # keeps its local top-10, the final block ranks ≤ 10×blocks rows; no
    # second (sort) all-to-all after the agg exchange
    def topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows <= 10:
            return batch
        rev = batch["revenue_bp"].to_numpy()
        key = batch["l_orderkey"].to_numpy()
        order = np.lexsort((key, -rev))[:10]
        return batch.take(pa.array(order))

    from engine.rayds.shuffle import tree_fold_refs

    part = agg.map_batches(rename, batch_format="pyarrow", batch_size=None
                           ).map_batches(topk, batch_format="pyarrow",
                                         batch_size=None)
    return ray.data.from_arrow(tree_fold_refs(
        part, lambda tbls: topk(pa.concat_tables(tbls).combine_chunks())))


def _q_lag_gap(sf_dir):
    """Per-key LAG window function: for every event, microseconds since
    the user's previous event (−1 for the first — the SQL COALESCE
    mirror; Arrow nulls hash differently across engines).  One hash
    exchange on user_id, per-partition lexsort by (user, ts, event_id)
    + vectorized diff — the sessionize shape without the segment
    reduction."""
    import ray.data

    def part_fn(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_part"])
        u = g["user_id"].to_numpy()
        ts = g["ts"].cast(pa.int64()).to_numpy()
        eid = g["event_id"].to_numpy()
        order = np.lexsort((eid, ts, u))
        u, ts, eid = u[order], ts[order], eid[order]
        gap = np.full(len(u), -1, dtype=np.int64)
        if len(u) > 1:
            same = u[1:] == u[:-1]
            gap[1:][same] = (ts[1:] - ts[:-1])[same]
        return pa.table({"event_id": pa.array(eid),
                         "gap_us": pa.array(gap)})

    from engine.rayds.shuffle import hash_exchange_groups

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    )
    return hash_exchange_groups(ds, ["user_id"], part_fn)


def _q_hopping_window(sf_dir):
    """HOPPING-WINDOW aggregate (overlapping windows: 1 h size, 30 min
    hop — each event belongs to 2 windows): window-replica explode
    inside the combiner, then the usual partial-count tree reduce.
    The overlap is handled by the EXPLODE, not a second pass."""
    import ray.data

    from engine.rayds.shuffle import grouped_count

    H = 3_600_000_000
    HOP = H // 2

    def explode(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy()
        et = batch["event_type"]
        # windows starting at hop boundaries covering ts:
        # starts in (ts - H, ts] on the HOP grid — exactly H/HOP = 2
        last = (ts // HOP) * HOP
        starts = np.concatenate([last, last - HOP])
        keep = starts > np.concatenate([ts, ts]) - H
        et2 = pa.concat_arrays([et.combine_chunks(), et.combine_chunks()])
        t = pa.table({"win_start_us": pa.array(starts),
                      "event_type": et2}).filter(pa.array(keep))
        return t

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"]
    ).map_batches(explode, batch_format="pyarrow", batch_size=None,
                  zero_copy_batch=True)
    return grouped_count(ev, ["win_start_us", "event_type"], out_col="n_events")


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def _q_pivot_user_events(sf_dir):
    """PIVOT (wide conditional aggregation): per-user count of each
    event type as columns — per-block indicator-sum combiner, one hash
    exchange on user_id (the reusable hash_shuffle_agg shape)."""
    import pyarrow.compute as pc
    import ray.data

    from engine.rayds.shuffle import hash_shuffle_agg

    cols = [f"n_{t}" for t in EVENT_TYPES]

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"user_id": batch["user_id"], **{
            f"n_{ty}": pc.cast(pc.equal(batch["event_type"], ty), pa.int64())
            for ty in EVENT_TYPES
        }})
        g = t.group_by(["user_id"]).aggregate([(c, "sum") for c in cols])
        return g.rename_columns(["user_id"] + cols)

    part = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    ).map_batches(partial, batch_format="pyarrow", batch_size=None,
                  zero_copy_batch=True)
    return hash_shuffle_agg(part, ["user_id"],
                            [(c, "sum") for c in cols], cols)


def _q_props_topk(sf_dir):
    """Semi-structured metadata extraction: pull the integer ``k`` field
    out of the JSON ``props`` column with ONE vectorized RE2 pass
    (pc.extract_regex — no row loops, no JSON parser objects), count per
    value (combiner + tree reduce: tiny key space), top-20."""
    import pyarrow.compute as pc
    import ray.data

    from engine.rayds.shuffle import grouped_count

    def extract(batch: pa.Table) -> pa.Table:
        m = pc.extract_regex(batch["props"], r'"k": (?P<k>[0-9]+)')
        k = pc.cast(pc.struct_field(m, "k"), pa.int64())
        t = pa.table({"k": k})
        return t.filter(pc.is_valid(t["k"]))

    ks = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["props"]
    ).map_batches(extract, batch_format="pyarrow", batch_size=None,
                  zero_copy_batch=True)
    counts = grouped_count(ks, ["k"], out_col="cnt")
    return counts.sort(["cnt", "k"], descending=[True, False]).limit(20)


def _q_kmeans_embed(sf_dir):
    """Full-dataset distributed spherical k-means over the embeddings
    table (broadcast-iterate Lloyd: centroids via ray.put per round,
    per-block partial sums, 16-way tree fold — no shuffle).  Output:
    per-cluster sizes (deterministic farthest-point init).  Rows-only
    check; the rigorous pin is test_kmeans_full_separated_clusters
    (exact sizes + center recovery + single-process Lloyd parity)."""
    import ray.data

    from engine.ops.ann import kmeans_full

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["embedding"])
    cents, counts = kmeans_full(ds, k=8, iters=10)
    return pa.table({
        "cluster": pa.array(np.arange(len(counts), dtype=np.int64)),
        "n_vectors": pa.array(counts),
    })


def _q_dedup_canonical(sf_dir):
    """END-TO-END near-dup removal: candidate pairs → exact-Jaccard
    verify → connected components → drop every non-canonical member
    (keep cluster min), i.e. the composition a user actually runs to
    dedup a corpus.  The drop set (non-canonical ids) is bounded by the
    verified-duplicate count — broadcast once via ray.put while it fits
    ``DEDUP_DROP_BUDGET``; past the budget the exact distributed
    fallback co-partitions docs and drop ids by hash(doc_id) and filters
    per partition (nothing unbounded on the driver)."""
    import pyarrow.compute as pc
    import ray

    clusters = _q_dedup_clusters(sf_dir)

    def non_canon(batch: pa.Table) -> pa.Table:
        m = pc.not_equal(batch["doc_id"], batch["cluster_id"])
        return batch.filter(m).select(["doc_id"])

    # bounded driver fold: abort to the distributed cogroup filter the
    # moment the running drop-set size overflows the broadcast budget
    acc, acc_len, overflow = [], 0, False
    nc = clusters.map_batches(non_canon, batch_format="pyarrow",
                              batch_size=None)
    for b in nc.iter_batches(batch_format="pyarrow"):
        arr = b["doc_id"]
        acc.append(arr.combine_chunks() if isinstance(arr, pa.ChunkedArray)
                   else arr)
        acc_len += len(b)
        if acc_len > DEDUP_DROP_BUDGET:
            overflow = True
            break
    if overflow:
        # exact distributed fallback: co-partition docs and drop ids by
        # hash(doc_id), keep docs absent from their partition's drop set
        import pyarrow.compute as _pc

        def tag(side: int):
            def fn(batch: pa.Table) -> pa.Table:
                return pa.table({
                    "doc_id": batch["doc_id"],
                    "_side": pa.array(np.full(len(batch), side, np.int8)),
                })
            return fn

        docs = _docs(sf_dir).select_columns(["doc_id"]).map_batches(
            tag(0), batch_format="pyarrow", batch_size=None)
        drops = nc.map_batches(tag(1), batch_format="pyarrow",
                               batch_size=None)

        def keep_group(group: pa.Table) -> pa.Table:
            g = group.drop_columns(["_part"])
            side = g["_side"].to_numpy()
            ids = g["doc_id"].to_numpy()
            bad = np.unique(ids[side == 1])
            mine = ids[side == 0]
            keep_m = ~np.isin(mine, bad)
            return pa.table({"doc_id": pa.array(mine[keep_m])})

        from engine.rayds.shuffle import hash_exchange_groups

        return hash_exchange_groups(docs.union(drops), ["doc_id"],
                                    keep_group)

    drop = pa.concat_tables([pa.table({"doc_id": a}) for a in acc]) if acc \
        else pa.table({"doc_id": pa.array([], type=pa.int64())})
    ref = ray.put(drop["doc_id"].combine_chunks() if drop.num_rows
                  else pa.array([], type=pa.int64()))

    def keep(batch: pa.Table) -> pa.Table:
        ids = ray.get(ref)
        m = pc.invert(pc.is_in(batch["doc_id"], value_set=ids))
        return batch.filter(m).select(["doc_id"])

    return _docs(sf_dir).select_columns(["doc_id"]).map_batches(
        keep, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )


def _q_cc_iterative(sf_dir):
    """Connected components on a bench-scale chain graph, FORCED through
    the iterative distributed plan (hash-min label propagation +
    pointer jumping, 2 exchanges/round) — the plan the adaptive
    ``connected_components`` only takes beyond its 1M-edge budget, which
    sf-scale candidate graphs never reach.  Graph: events × 16 node
    expansion, chains of length 128 (worst-case propagation depth;
    ~log2(128) rounds).  Closed-form oracle: cluster = (n // 128) * 128.
    """
    import ray.data

    from engine.ops.graph import connected_components

    K, CL = 16, 128
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])
    # metadata-only count: the GLOBAL max node must not emit an edge to a
    # nonexistent node when 16·E isn't a multiple of 128 (event_ids are
    # contiguous 0..E-1 in the testdata — asserted by the oracle's node
    # set too)
    n_events = ds.count()

    def edges(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy()
        n = (eid[:, None] * K + np.arange(K, dtype=np.int64)[None, :]).reshape(-1)
        a = n[((n % CL) != (CL - 1)) & (n != K * n_events - 1)]
        return pa.table({"a": pa.array(a), "b": pa.array(a + 1)})

    e = ds.map_batches(edges, batch_format="pyarrow", batch_size=None,
                       zero_copy_batch=True)
    return connected_components(e, small_graph_rows=0)


def _q_pack_sequences(sf_dir):
    """Concat-and-chunk SEQUENCE PACKING (the LLM training-data op):
    global token offsets via the two-phase distributed scan
    (engine/ops/scan.py — 3 ints per block to the driver, no shuffle),
    then seq_id = offset // 2048."""
    from engine.ops.scan import pack_sequences

    return pack_sequences(_docs(sf_dir), capacity=2048)


def _q_value_quantiles_sketch(sf_dir):
    """Approximate event-value quantiles via the deterministic MRL
    sketch (engine/ops/sketch.py) — the continuous-value scale path
    (per-block sketch partials, driver fold, NO exchange).  The sketch's
    self-certified rank bound is asserted against the exact quantiles
    computed by the same driver fold's n (rows-only check; the rigorous
    pin is test_mrl_quantiles_guaranteed_bound)."""
    import ray.data

    from engine.ops.sketch import mrl_quantiles

    qs = [0.25, 0.5, 0.75, 0.95]
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])
    vals, n, err = mrl_quantiles(ds, "value", qs, k=256)
    assert err <= max(1, n // 20)  # bound stays within 5% of n
    return pa.table({
        "q": pa.array(qs),
        "value": pa.array(vals),
        "n": pa.array([n] * len(qs), type=pa.int64()),
        "err_bound": pa.array([err] * len(qs), type=pa.int64()),
    })


def _q_interval_join(sf_dir):
    """INTERVAL OVERLAP JOIN (1-D range family): click sessions
    [ts, ts+10min] × error windows [ts, ts+7min] — time-bucket
    co-partition, one union exchange, overlap-start bucket dedupe (no
    second exchange; see engine/ops/interval.py)."""
    import pyarrow.compute as pc
    import ray.data

    from engine.ops.interval import interval_join

    def pick(etype: str, span_us: int):
        def fn(batch: pa.Table) -> pa.Table:
            m = pc.equal(batch["event_type"], etype)
            t = batch.filter(m)
            t0 = t["ts"].cast(pa.int64())
            return pa.table({
                "_id": t["event_id"],
                "_t0": t0,
                "_t1": pc.add(t0, span_us),
            })
        return fn

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "event_type"]
    )
    left = ev.map_batches(pick("click", 600_000_000), batch_format="pyarrow",
                          batch_size=None, zero_copy_batch=True)
    right = ev.map_batches(pick("error", 420_000_000), batch_format="pyarrow",
                           batch_size=None, zero_copy_batch=True)
    return interval_join(left, right, bucket_us=900_000_000,
                         id_cols=("l_event", "r_event"))


def _q_tile_mosaics(sf_dir):
    """Per-(poly, tile) raster mosaic materialization (north_rule);
    metadata columns oracle-checked (grid dims derive from counts)."""
    from engine.rayds.mosaic import tile_mosaics

    return tile_mosaics(sf_dir).select_columns(
        ["poly_id", "tile_id", "n_images", "mosaic_w", "mosaic_h"]
    )


def _q_sample_images(sf_dir):
    """Deterministic content-hash sampling (the eval-set / holdout split
    op of a training-data pipeline): keep rows whose md5(image_id) first
    nibble < 4 — an exact, order-independent 4/16 sample, reproducible
    on any cluster size.  MD5 is vectorized over the Arrow string buffer
    (engine/ops/vhash.py) — no per-row hashlib loop."""
    import pyarrow as pa

    from engine.ops.vhash import md5_first_nibble
    from engine.rayds.imagetab import image_dataset

    def flt(batch: pa.Table) -> pa.Table:
        keep = md5_first_nibble(batch["image_id"]) < 4
        return batch.filter(pa.array(keep))

    return (
        image_dataset(sf_dir)
        .map_batches(flt, batch_format="pyarrow", batch_size=None)
        .select_columns(["image_id", "x", "y"])
    )


def _q_stratified_sample(sf_dir):
    """STRATIFIED deterministic sampling: the 50 events with smallest
    md5(event_id) per event_type — the per-class train/eval split of a
    training-data pipeline, reproducible on any cluster size.  Scale
    shape: per-block local top-K per group (combiner) → one exchange on
    the group key → per-group final top-K.  MD5 rank keys are computed
    vectorized (engine/ops/vhash.py) — no per-row hashlib loop; the
    per-class slice loop below runs over ≤ n_event_types entries, not
    rows."""
    import ray.data

    from engine.ops.vhash import md5_hex
    K = 50

    def topk_tbl(tbl: pa.Table) -> pa.Table:
        ids = tbl["event_id"].to_numpy()
        et = np.asarray(tbl["event_type"].to_pylist(), dtype=object)
        h = md5_hex(ids.astype(str))
        keep: list[int] = []
        for t in np.unique(et):
            idx = np.nonzero(et == t)[0]
            order = np.lexsort((ids[idx], h[idx]))[:K]
            keep.extend(idx[order].tolist())
        keep_arr = np.sort(np.asarray(keep, dtype=np.int64))
        return tbl.take(pa.array(keep_arr))

    def final(group: pa.Table) -> pa.Table:
        return topk_tbl(group.drop_columns(["_part"]))

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "event_id"]
    )
    from engine.rayds.shuffle import hash_exchange_groups

    local = ds.map_batches(topk_tbl, batch_format="pyarrow", batch_size=None)
    return hash_exchange_groups(local, ["event_type"], final)


def _q_lang_topwords(sf_dir):
    """Per-GROUP top-k (windowed ranking): top-5 words per detected
    language — combiner-first (lang, word) counts then a tiny per-lang
    ranking group; the SQL oracle uses row_number() over partitions."""
    import numpy as np
    import pyarrow.compute as pc

    from engine.ops import text
    from engine.rayds.shuffle import grouped_count

    def explode(batch: pa.Table) -> pa.Table:
        t = text.lang_id(batch)
        words = pc.split_pattern(t["text"], " ")
        n = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        lang = np.repeat(np.asarray(t["pred_lang"].to_pylist(), dtype=object), n)
        return pa.table(
            {"lang": pa.array(lang.tolist(), type=pa.string()),
             "word": pc.list_flatten(words)}
        )

    ds = _docs(sf_dir).select_columns(["doc_id", "text"]).map_batches(
        explode, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
    counts = grouped_count(ds, ["lang", "word"], out_col="cnt", use_shuffle="auto")

    def top5(group: pa.Table) -> pa.Table:
        import numpy as np

        cnt = group["cnt"].to_numpy()
        words = np.asarray(group["word"].to_pylist(), dtype=object)
        order = np.lexsort((words, -cnt))[:5]
        return pa.table(
            {
                "lang": group["lang"].take(pa.array(order, type=pa.int64())),
                "word": pa.array(words[order].tolist(), type=pa.string()),
                "cnt": pa.array(cnt[order], type=pa.int64()),
            }
        )

    from engine.rayds.shuffle import hash_exchange_fine_groups

    return hash_exchange_fine_groups(counts, ["lang"], top5)


def _q_tile_region_vectors(sf_dir):
    """RASTER→VECTOR: per-polygon lit-tile raster vectorized to its
    union polygon (engine overlay); integer invariants measured on the
    vector form (area / edge-length quantization) against a pure-SQL
    grid-adjacency oracle."""
    from engine.rayds.mosaic import tile_region_vectors

    return tile_region_vectors(sf_dir)


# -------------------------------------------------------------- text queries
def _docs(sf_dir):
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/documents.parquet")


def _q_token_stats(sf_dir):
    from engine.ops import text

    return (
        _docs(sf_dir)
        .map_batches(text.token_stats, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
        .select_columns(["doc_id", "n_tokens", "n_bpe_tokens", "n_chars_calc"])
    )


def _q_word_topk(sf_dir):
    import pyarrow.compute as pc

    from engine.rayds.shuffle import grouped_count

    def explode(batch: pa.Table) -> pa.Table:
        words = pc.split_pattern(batch["text"], " ")
        flat = pc.list_flatten(words)
        return pa.table({"word": flat})

    words = _docs(sf_dir).select_columns(["text"]).map_batches(
        explode, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
    # word cardinality grows with the corpus: the sampled plan chooser
    # switches the count to the hash-shuffle plan (no single-block merge)
    counts = grouped_count(words, ["word"], out_col="cnt", use_shuffle="auto")
    return counts.sort(["cnt", "word"], descending=[True, False]).limit(20)


def _q_heavy_hitters(sf_dir):
    """Top-10 words via ZERO-SHUFFLE heavy hitters (Misra–Gries block
    summaries → driver fold → broadcast exact recount).  The scale path
    when word cardinality makes the exact groupby's all-to-all too wide;
    the MG guarantee is asserted (m-th count > summed decrement bound),
    so the output is provably the true top-10."""
    import pyarrow.compute as pc
    import ray.data

    from engine.ops.heavyhitters import heavy_hitters

    def explode(batch: pa.Table) -> pa.Table:
        return pa.table({"word": pc.list_flatten(
            pc.split_pattern(batch["text"], " "))})

    words = _docs(sf_dir).select_columns(["text"]).map_batches(
        explode, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
    out, bound = heavy_hitters(words, "word", m=10)
    assert out.num_rows < 10 or int(out["cnt"][9].as_py()) > bound
    return ray.data.from_arrow(out)


def _q_dedup_exact(sf_dir):
    """Exact dedup on a 16-char prefix key (hash-partition + per-group
    first): keep lowest doc_id + copy count per key."""
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        key = pc.utf8_slice_codeunits(batch["text"], 0, 16)
        t = pa.table({"key16": key, "doc_id": batch["doc_id"]})
        g = t.group_by(["key16"]).aggregate([("doc_id", "min"), ("doc_id", "count")])
        return g.rename_columns(["key16", "_min_id", "_cnt"])

    from engine.rayds.shuffle import hash_shuffle_agg

    part = _docs(sf_dir).select_columns(["doc_id", "text"]).map_batches(
        partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
    merged = hash_shuffle_agg(
        part, ["key16"], [("_min_id", "min"), ("_cnt", "sum")],
        ["doc_id", "n_copies"],
    )
    return merged


def _q_lang_quality(sf_dir):
    from engine.ops import text
    from engine.rayds.shuffle import grouped_count

    ds = (
        _docs(sf_dir)
        .map_batches(text.lang_id, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
        .map_batches(text.quality_score, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
        .select_columns(["pred_lang"])
    )
    return grouped_count(ds, ["pred_lang"], out_col="n_docs")


def _q_minhash_pairs(sf_dir):
    """MinHash+LSH candidate pairs (md5-hash family): every hash in the
    tokenize→shingle→permute→band→bucket chain is the MD5 top-64, so a
    DuckDB oracle reproduces the candidate set bit-exactly (dedup.py
    md5-LSH section).  The integer-mix family (minhash_candidate_pairs)
    remains the cheaper 100-TB path, recall-pinned in pytest."""
    from engine.ops import dedup

    return dedup.minhash_candidate_pairs_md5(
        _docs(sf_dir).select_columns(["doc_id", "text"])
    )


def _q_simhash_pairs(sf_dir):
    """EXACT Hamming-≤7 SimHash pairs (md5-token family): 8 bands × 8
    bits + in-bucket exact Hamming — pigeonhole gives provable recall 1,
    and the md5 hashes make the whole chain a DuckDB oracle.  The
    integer-hash simhash_near_pairs stays pytest-pinned as the cheap
    path."""
    from engine.ops import dedup

    return dedup.simhash_pairs_md5(
        _docs(sf_dir).select_columns(["doc_id", "text"]), max_ham=7
    )


# --------------------------------------------------------- embedding queries
def _embeddings(sf_dir):
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")


def _load_query_vecs(sf_dir, n=5):
    """The n query vectors (driver-side INPUT, not a materialization:
    the read is filter-pushed to the row groups holding vec_id < n)."""
    import pyarrow.parquet as pq

    from engine.ops.dedup import _emb_matrix

    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", n)],
    )
    return _emb_matrix(t["embedding"]), t["vec_id"].to_numpy()


def _q_ann_topk(sf_dir):
    from engine.ops import ann

    q, qids = _load_query_vecs(sf_dir, 5)
    return ann.topk_cosine(_embeddings(sf_dir), q, qids, k=10)


def _q_pq_ann_topk(sf_dir):
    """PRODUCT-QUANTIZATION ANN (the 16×-compressed scale path beside
    brute/LSH/IVF): bounded-sample codebook → broadcast → one streaming
    encode+ADC-score pass over code bytes → fine-key merge.  Hash/
    kmeans-derived ranking ⇒ no SQL oracle; recall@10 vs the exact
    brute force is pinned by pytest."""
    from engine.ops import ann

    q, qids = _load_query_vecs(sf_dir, 5)
    d = int(q.shape[1])
    m = next(mm for mm in (16, 8, 4, 2, 1) if d % mm == 0)
    return ann.pq_topk(_embeddings(sf_dir), q, qids, k=10, m=m,
                       kcent=128)


def _q_embed_dedup(sf_dir):
    """Exact cosine-threshold self-join as the distributed block-pair
    plan (no driver read, no full-matrix broadcast)."""
    from engine.ops.dedup import embed_dedup_pairs

    return embed_dedup_pairs(_embeddings(sf_dir), threshold=0.4, num_blocks=8)


def _q_psnr_validate(sf_dir):
    from engine.rayds.imgstage import validate_dataset

    return validate_dataset(sf_dir).select_columns(["image_id", "psnr_ok"])


def _q_img_features(sf_dir):
    """Decode → resize → featurize actor-pool stage (multimodal path).

    Emits the INTEGER-EXACT feature (299R+587G+114B grayscale sum over
    the 16×16 thumbnail): synth pixels, the qraw quantizer and the md5
    seed rule are all integer/md5 arithmetic, so a DuckDB oracle
    reproduces the full decode→resize→featurize chain bit-exactly (no
    float summation-order hazard).  The float features (thumb_phash,
    thumb_mean) stay pytest-pinned."""
    from engine.rayds.imgstage import features_dataset

    return features_dataset(sf_dir).select_columns(
        ["image_id", "thumb_gray_sum"]
    )


def _q_pricing_summary(sf_dir):
    """TPC-H Q1-shaped pricing summary over lineitem: per
    (returnflag, linestatus) the exact integer-scaled sums — quantity,
    base price cents, discounted price basis points, charge at 1e-6
    scale — plus row count.  Combiner-first per block, tree reduce
    (constant 4-group key cardinality)."""
    import ray.data

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount", "l_tax"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        ep = batch["l_extendedprice"].to_numpy()
        d = batch["l_discount"].to_numpy()
        tx = batch["l_tax"].to_numpy()
        t = pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "_q": pa.array(np.floor(batch["l_quantity"].to_numpy())
                               .astype(np.int64)),
                "_b": pa.array(np.floor(ep * 100.0).astype(np.int64)),
                "_d": pa.array(np.floor(ep * (1.0 - d) * 10000.0)
                               .astype(np.int64)),
                "_c": pa.array(np.floor(ep * (1.0 - d) * (1.0 + tx)
                                        * 1000000.0).astype(np.int64)),
                "_n": pa.array(np.ones(len(batch), dtype=np.int64)),
            }
        )
        t = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("_q", "sum"), ("_b", "sum"), ("_d", "sum"), ("_c", "sum"),
             ("_n", "sum")]
        )
        return t.rename_columns(
            ["l_returnflag", "l_linestatus", "_q", "_b", "_d", "_c", "_n"]
        )

    from engine.rayds.shuffle import tree_fold_refs

    # fold with a PARTIAL-named merge (closed under composition); the
    # final column names are applied once on the folded table
    def merge_p(tbls):
        t = pa.concat_tables(tbls).combine_chunks()
        g = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("_q", "sum"), ("_b", "sum"), ("_d", "sum"), ("_c", "sum"),
             ("_n", "sum")]
        )
        return g.rename_columns(
            ["l_returnflag", "l_linestatus", "_q", "_b", "_d", "_c", "_n"])

    part = ds.map_batches(partial, batch_format="pyarrow", batch_size=None,
                          zero_copy_batch=True)
    return ray.data.from_arrow(tree_fold_refs(part, merge_p).rename_columns(
        ["l_returnflag", "l_linestatus", "sum_qty", "sum_base_cents",
         "sum_disc_bp", "sum_charge_6", "count_order"]))


def _q_cust_urgent(sf_dir):
    """LEFT OUTER equi-join showcase: customers ⋈ urgent orders — per
    market segment, total joined rows and how many customers have NO
    urgent order (null right side).  The adaptive plan streams the
    preserved (left) side and broadcasts the small right side; past the
    broadcast budget the tagged-union hash plan takes over (key
    co-location makes pyarrow's outer join partition-local)."""
    import pyarrow.compute as pc
    import ray.data

    from engine.rayds.shuffle import equi_join

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderkey", "o_orderpriority"],
    )

    def urgent(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.equal(batch["o_orderpriority"], "1-URGENT")
        ).select(["o_custkey", "o_orderkey"])

    joined = equi_join(
        cust, orders.map_batches(urgent, batch_format="pyarrow", batch_size=None),
        "c_custkey", "o_custkey", ["c_mktsegment"], ["o_orderkey"],
        join_type="left outer",
    )

    def partial(batch: pa.Table) -> pa.Table:
        nulls = pc.is_null(batch["o_orderkey"])
        t = pa.table(
            {
                "c_mktsegment": batch["c_mktsegment"],
                "_n": pa.array(np.ones(len(batch), dtype=np.int64)),
                "_un": pa.array(nulls.to_numpy(zero_copy_only=False)
                                .astype(np.int64)),
            }
        )
        t = t.group_by(["c_mktsegment"]).aggregate([("_n", "sum"), ("_un", "sum")])
        return t.rename_columns(["c_mktsegment", "_n", "_un"])

    from engine.rayds.shuffle import tree_fold_refs

    def merge_p(tbls):
        t = pa.concat_tables(tbls).combine_chunks().group_by(
            ["c_mktsegment"]).aggregate([("_n", "sum"), ("_un", "sum")])
        return t.rename_columns(["c_mktsegment", "_n", "_un"])

    part = joined.map_batches(partial, batch_format="pyarrow",
                              batch_size=None)
    return ray.data.from_arrow(tree_fold_refs(part, merge_p).rename_columns(
        ["c_mktsegment", "n_rows", "n_unmatched"]))


def _q_order_revenue(sf_dir):
    """Generic distributed EQUI-JOIN showcase (TPC-H-shaped): orders ⋈
    lineitem on orderkey through the engine's one-exchange tagged-union
    hash join, then revenue (exact basis-point int64) per order
    priority via the hash-shuffle aggregate."""
    import ray.data

    from engine.rayds.shuffle import equi_join

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    )
    lineitem = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )
    joined = equi_join(
        orders, lineitem, "o_orderkey", "l_orderkey",
        ["o_orderpriority"], ["l_extendedprice", "l_discount"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        bp = np.floor(
            batch["l_extendedprice"].to_numpy()
            * (1.0 - batch["l_discount"].to_numpy()) * 10000.0
        ).astype(np.int64)
        t = pa.table(
            {"o_orderpriority": batch["o_orderpriority"], "_bp": pa.array(bp),
             "_n": pa.array(np.ones(len(batch), dtype=np.int64))}
        )
        t = t.group_by(["o_orderpriority"]).aggregate(
            [("_bp", "sum"), ("_n", "sum")]
        )
        return t.rename_columns(["o_orderpriority", "_bp", "_n"])

    def merge(batch: pa.Table) -> pa.Table:
        t = batch.group_by(["o_orderpriority"]).aggregate(
            [("_bp", "sum"), ("_n", "sum")]
        )
        return t.rename_columns(["o_orderpriority", "_bp", "_n"])

    # o_orderpriority has constant (5-value) cardinality — raw-task tree
    # fold, no exchange (the hash-shuffle merge is for unbounded keys)
    from engine.rayds.shuffle import tree_fold_refs

    partials = joined.map_batches(partial, batch_format="pyarrow", batch_size=None)
    folded = tree_fold_refs(
        partials, lambda tbls: merge(pa.concat_tables(tbls).combine_chunks()))
    return ray.data.from_arrow(
        folded.rename_columns(["o_orderpriority", "revenue_bp", "n_items"]))


def _q_rasterize_cover(sf_dir):
    """VECTOR→RASTER: burn every layer polygon onto the global 5-unit
    grid — one row per (poly, cell) with the EXACT coverage area
    (vectorized interval arithmetic; per-poly covering cell ranges via
    floor bounds + repeat/arange explode, no Python loop per cell).
    Completes the raster↔vector pair with tile_region_vectors."""
    import ray.data

    from engine.rayds.imagetab import load_layer

    CELL = 5.0
    layer = load_layer(sf_dir)
    polys = pa.table(
        {
            "poly_id": pa.array(layer.poly_ids),
            "xmin": pa.array(layer.bounds[:, 0]),
            "ymin": pa.array(layer.bounds[:, 1]),
            "xmax": pa.array(layer.bounds[:, 2]),
            "ymax": pa.array(layer.bounds[:, 3]),
        }
    )

    def burn(batch: pa.Table) -> pa.Table:
        pid = batch["poly_id"].to_numpy()
        x0 = batch["xmin"].to_numpy()
        y0 = batch["ymin"].to_numpy()
        x1 = batch["xmax"].to_numpy()
        y1 = batch["ymax"].to_numpy()
        ix0 = np.floor(x0 / CELL).astype(np.int64)
        ix1 = np.ceil(x1 / CELL).astype(np.int64)  # exclusive
        iy0 = np.floor(y0 / CELL).astype(np.int64)
        iy1 = np.ceil(y1 / CELL).astype(np.int64)
        nx = ix1 - ix0
        ny = iy1 - iy0
        per = nx * ny
        total = int(per.sum())
        rep = np.repeat(np.arange(len(pid), dtype=np.int64), per)
        within = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(per) - per, per
        )
        cx = ix0[rep] + within % nx[rep]
        cy = iy0[rep] + within // nx[rep]
        w = np.minimum(x1[rep], (cx + 1) * CELL) - np.maximum(x0[rep], cx * CELL)
        h = np.minimum(y1[rep], (cy + 1) * CELL) - np.maximum(y0[rep], cy * CELL)
        area = np.clip(w, 0, None) * np.clip(h, 0, None)
        keep = area > 0
        return pa.table(
            {
                "poly_id": pa.array(pid[rep][keep]),
                "cell_x": pa.array(cx[keep]),
                "cell_y": pa.array(cy[keep]),
                "cover_area": pa.array(area[keep]),
            }
        )

    return ray.data.from_arrow(polys).map_batches(
        burn, batch_format="pyarrow", batch_size=None
    )


def _q_value_quantiles(sf_dir):
    """Per-event-type EXACT discrete quantiles of integer cents via
    distributed counting (exchange volume = distinct (type, cents)
    pairs, not rows — the 100-TB-exact-quantile shape)."""
    import ray.data

    from engine.ops.sketch import grouped_quantiles

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )

    def to_cents(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": batch["event_type"],
                "cents": pa.array(
                    np.floor(batch["value"].to_numpy() * 100.0).astype(np.int64)
                ),
            }
        )

    proj = ds.map_batches(to_cents, batch_format="pyarrow", batch_size=None,
                          zero_copy_batch=True)
    return grouped_quantiles(proj, "event_type", "cents")


def _q_distinct_users(sf_dir):
    """Per-event-type exact COUNT(DISTINCT user): per-block (type, user)
    dedup combiner → one hash exchange on the type key → per-partition
    distinct count.  The approximate scale path (per-block HyperLogLog
    register partials, np.maximum tree-merge, 4 KB per partial) lives in
    engine/ops/sketch.py and is pinned by an error-bound pytest."""
    import ray.data

    from engine.ops.sketch import distinct_count_exact

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id"]
    )
    return distinct_count_exact(ds, "event_type", "user_id")


def _q_session_agg(sf_dir):
    """SESSION-WINDOW aggregate: per user, events split into sessions at
    >30-minute gaps; count + integer-cents sum per session.  One hash
    exchange on user_id; per-partition sessionization fully vectorized
    (lexsort + gap diff + reduceat)."""
    import ray.data

    from engine.rayds.shuffle import sessionize

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "user_id", "value"]
    )

    def project(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch["user_id"],
                "ts_us": batch["ts"].cast(pa.int64()),
                "cents": pa.array(
                    np.floor(batch["value"].to_numpy() * 100.0).astype(np.int64)
                ),
            }
        )

    proj = ds.map_batches(project, batch_format="pyarrow", batch_size=None,
                          zero_copy_batch=True)
    return sessionize(proj, "user_id", "ts_us", gap_us=1_800_000_000,
                      sum_col="cents")


def _q_session_agg_split(sf_dir):
    """Skew-proof session windows: (key, time-bucket) pre-split with
    boundary stitching — a hot key's events spread over its time range
    instead of one partition (same result as session_agg)."""
    import ray.data

    from engine.rayds.shuffle import sessionize_split

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "user_id", "value"]
    )

    def project(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch["user_id"],
                "ts_us": batch["ts"].cast(pa.int64()),
                "cents": pa.array(
                    np.floor(batch["value"].to_numpy() * 100.0).astype(np.int64)
                ),
            }
        )

    proj = ds.map_batches(project, batch_format="pyarrow", batch_size=None,
                          zero_copy_batch=True)
    return sessionize_split(proj, "user_id", "ts_us", gap_us=1_800_000_000,
                            sum_col="cents", bucket_us=7 * 24 * 3_600_000_000)


def _q_video_frames(sf_dir):
    """Video frame-sampling stage (deterministic fake codec): one row
    per sampled frame; the sampling arithmetic (n_frames = 4 + id%5,
    every 3rd frame) is the oracle-checked part — the per-frame phash
    is computed in the stage but projected out (not SQL-expressible)."""
    from engine.rayds.imgstage import frames_dataset

    return frames_dataset(sf_dir, every_n=3).select_columns(
        ["image_id", "frame_idx"]
    )


def _q_minhash_verified(sf_dir):
    """MinHash candidates verified with EXACT n-gram Jaccard — the
    adversarial-verify stage, fully distributed (candidate pairs
    hash-join the per-doc shingle-set table; verify in map_batches).
    md5-hash family, so candidates AND the exact-Jaccard verdicts are
    reproducible as a DuckDB oracle."""
    from engine.ops import dedup

    return dedup.minhash_verified_pairs_md5(
        _docs(sf_dir).select_columns(["doc_id", "text"]), threshold=0.5
    )


def _q_ann_topk_lsh(sf_dir):
    """LSH-bucketed top-k (the 100-TB ANN scale path), run at the
    EXHAUSTIVE probe setting: multiprobe = nbits probes every bucket
    within Hamming radius nbits, i.e. all 2^nbits buckets, so the
    candidate set is the full corpus and the result provably equals the
    exact top-k — SQL-oracle-checkable while still exercising the
    plane-hash/bucket-filter machinery.  The approximate settings
    (multiprobe < nbits) are recall-pinned in pytest."""
    from engine.ops import ann

    q, qids = _load_query_vecs(sf_dir, 3)
    return ann.topk_cosine_lsh(_embeddings(sf_dir), q, qids, k=10,
                               nbits=4, dim=int(q.shape[1]), multiprobe=4)


def _q_ann_topk_ivf(sf_dir):
    """IVF (inverted-file) top-k — the second ANN scale path (coarse
    k-means lists + nprobe probing), run at nprobe = n_lists: every
    inverted list is scanned, so the result provably equals the exact
    top-k regardless of the k-means outcome — SQL-oracle-checkable
    while still exercising the assign/probe machinery.  Approximate
    nprobe settings are recall-pinned in pytest."""
    from engine.ops import ann

    q, qids = _load_query_vecs(sf_dir, 3)
    return ann.topk_cosine_ivf(_embeddings(sf_dir), q, qids, k=10,
                               n_lists=16, nprobe=16)


DEDUP_DROP_BUDGET = 2_000_000  # drop-set broadcast budget (dedup_canonical)


BM25_TERMS = ["the", "join", "window"]


def _q_bm25_topk(sf_dir):
    """Top-20 documents by BM25 (rational idf — see engine/ops/text.py)
    against a fixed 3-term query: two streaming passes (tiny corpus-stat
    fold + scored block top-k combiner), nothing unbounded on the
    driver."""
    from engine.ops.text import bm25_topk

    return bm25_topk(_docs(sf_dir).select_columns(["doc_id", "text"]),
                     BM25_TERMS, k=20)


def _q_zorder_top100(sf_dir):
    """First 100 images in Z-ORDER (Morton-interleaved quantized x/y):
    the clustered-write ordering, through Ray Data's native distributed
    sort (range-partitioned all-to-all) + limit.  Ties (coincident
    quantized coords) broken by image_id."""
    from engine.ops.zorder import zorder_sorted
    from engine.rayds.imagetab import image_dataset

    ds = image_dataset(sf_dir).select_columns(["image_id", "x", "y"])
    return (
        zorder_sorted(ds, "x", "y", scale=1000.0, tiebreak="image_id")
        .limit(100)
        .select_columns(["image_id", "morton"])
    )


def _q_doc_fingerprint(sf_dir):
    """Oracle-checkable md5-prefix fingerprint (the crc fp64 variant
    remains the cheap shuffle key inside exact dedup)."""
    from engine.ops import text

    return (
        _docs(sf_dir)
        .map_batches(text.fingerprint_md5, batch_format="pyarrow", batch_size=None)
        .select_columns(["doc_id", "fp_hex"])
    )


def _q_dedup_clusters(sf_dir):
    """CONNECTED COMPONENTS over the similarity graph (every
    consecutive pair with exact 3-gram Jaccard ≥ 0.01 — the synthetic
    corpus has no true near-dup runs, so the low threshold makes a
    real multi-hop graph): doc → cluster representative (min doc id),
    via iterative hash-min label propagation + pointer jumping
    (engine/ops/graph.py)."""
    import pyarrow.compute as pc

    from engine.ops import dedup
    from engine.ops.graph import connected_components

    pairs = dedup.consecutive_jaccard(
        _docs(sf_dir).select_columns(["doc_id", "text"])
    )

    def thresh(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater_equal(batch["jaccard"], 0.01)).select(
            ["a", "b"]
        )

    edges = pairs.map_batches(thresh, batch_format="pyarrow", batch_size=None)
    return connected_components(edges)


def _q_ngram_jaccard(sf_dir):
    """Exact word-3-gram Jaccard for every consecutive doc pair — the
    oracle-checkable form of the dedup verify kernel (one shuffle;
    shingle-set bytes ride the exchange once per side)."""
    from engine.ops import dedup

    return dedup.consecutive_jaccard(
        _docs(sf_dir).select_columns(["doc_id", "text"])
    )


# ------------------------------------------------- stats / order statistics
def _q_corr_qty_price(sf_dir):
    """Exact-moment Pearson correlation of quantity × price: per-block
    INTEGER moment partials (quantity integral, price exact in cents)
    ride a decimal128 tree fold — zero shuffles, exact at any scale, and
    the final double mirrors the SQL oracle's evaluation order term by
    term (bit-identical)."""
    import ray.data

    from engine.ops.stats import exact_corr

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_quantity", "l_extendedprice"])
    return exact_corr(li, "l_quantity", "l_extendedprice",
                      xscale=1, yscale=100)


def _q_regr_price_qty(sf_dir):
    """Per-group least-squares regression (regr_slope/intercept + r) of
    price-in-cents on quantity, grouped by return flag — ZERO shuffles:
    per-block per-group exact integer moment partials (decimal128) ride
    a raw-task tree fold; the final doubles are computed from exact
    integers in one fixed evaluation order mirrored by the SQL oracle
    (bit-identical)."""
    import ray.data

    from engine.ops.stats import grouped_regression

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_extendedprice"])
    return grouped_regression(li, "l_returnflag", "l_quantity",
                              "l_extendedprice", xscale=1, yscale=100)


def _q_median_value(sf_dir):
    """EXACT distributed median (lower / quantile_disc 0.5) by histogram
    refinement task waves over the materialized value column — ≤4 rounds
    of 512 KiB folded histograms, never a sort, never a full collect."""
    import ray.data

    from engine.ops.kth import median

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])
    return median(ev, "value")


def _q_value_percentiles(sf_dir):
    """EXACT interpolated p25/p50/p90 (SQL quantile_cont semantics,
    bit-identical lerp) — all six lower/upper ranks resolve in the SAME
    shared histogram-refinement task waves."""
    import ray.data

    from engine.ops.kth import quantiles_cont

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])
    p25, p50, p90 = quantiles_cont(ev, "value", [0.25, 0.5, 0.9])
    return pa.table({
        "p25": pa.array([p25], type=pa.float64()),
        "p50": pa.array([p50], type=pa.float64()),
        "p90": pa.array([p90], type=pa.float64()),
    })


def _q_mode_user(sf_dir):
    """Per event-type MODE (most frequent user, ties → smallest id):
    combiner-first (key,value) counts, one hash exchange, vectorized
    per-partition argmax."""
    import ray.data

    from engine.ops.stats import grouped_mode

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id"])
    return grouped_mode(ev, "event_type", "user_id",
                        out_cols=("event_type", "mode_user", "n"))


def _q_latest_event(sf_dir):
    """Streaming-upsert compaction: ONE row per user — the latest event
    by (ts, event_id).  Per-block argmax keeps one row per key per block
    before the single exchange, so the all-to-all moves keys × blocks
    rows, never the event stream."""
    import ray.data

    from engine.ops.stats import latest_by_key

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type", "value"])
    return latest_by_key(ev, "user_id", ["ts", "event_id"],
                         ["event_type", "value"])


def _q_contamination(sf_dir):
    """Benchmark decontamination screen: corpus docs sharing any word
    5-gram with the benchmark slice (source='src0').  The benchmark's
    distinct n-gram set is built distributed, folded once (budget-
    guarded — eval suites are small by nature), broadcast via ray.put;
    the corpus side is ONE streaming pass with exact bytes-equality
    searchsorted probes — no hashes, no collisions, no shuffle."""
    import pyarrow.compute as pc
    import ray

    from engine.ops.contam import benchmark_ngram_set, contamination_screen

    docs = _docs(sf_dir).select_columns(["doc_id", "text", "source"])

    def is_bench(b):
        return b.filter(pc.equal(b["source"], "src0"))

    def not_bench(b):
        return b.filter(pc.invert(pc.equal(b["source"], "src0")))

    bench = docs.map_batches(is_bench, batch_format="pyarrow",
                             batch_size=None, zero_copy_batch=True)
    grams = benchmark_ngram_set(bench)
    ref = ray.put(grams)
    corpus = docs.map_batches(not_bench, batch_format="pyarrow",
                              batch_size=None, zero_copy_batch=True)
    return contamination_screen(corpus, ref)


def _q_knn_join(sf_dir):
    """EXACT big-big kNN join, grid-partitioned: every 20th image point
    finds its 4 nearest among ALL image points.  Rights keyed by their
    own grid cell (never replicated); lefts explode to doubling
    Chebyshev annuli until the strict d_k < R·s bound proves no unseen
    point can displace a kept neighbor — sf0.001's sparse grid (≈0.4
    points/cell) genuinely exercises the multi-round escalation."""
    import ray.data

    from engine.ops.knn import knn_join
    from engine.rayds.imagetab import derive_xy

    def pts(only_20th: bool):
        def fn(batch: pa.Table) -> pa.Table:
            eid = batch["event_id"].to_numpy()
            if only_20th:
                eid = eid[eid % 20 == 0]
            x, y = derive_xy(eid)
            return pa.table({"id": pa.array(eid), "x": x, "y": y})
        return fn

    import pyarrow.parquet as pq

    from engine.ops.knn import auto_cell

    base = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id"])
    right = base.map_batches(pts(False), batch_format="pyarrow",
                             batch_size=None, zero_copy_batch=True)
    left = base.map_batches(pts(True), batch_format="pyarrow",
                            batch_size=None, zero_copy_batch=True)
    # density-adaptive power-of-two cell (metadata row count, no scan):
    # ≥ ~2k expected ring-1 candidates ⇒ one escalation round typically
    n = pq.ParquetFile(f"{sf_dir}/events.parquet").metadata.num_rows
    cell = auto_cell(n, 100.0, 4)
    return knn_join(left, right, k=4, cell=cell, left_id="id",
                    right_id="id", exclude_same_id=True, grid_hi=100.0)


def _q_funnel_steps(sf_dir):
    """Ordered funnel signup → purchase → error (strictly increasing
    ts): one key-hash exchange of the pre-filtered (user, ts, step)
    stream, per-partition masked-reduceat chain, tree-folded 3-row
    result."""
    import ray.data

    from engine.ops.funnel import funnel_counts

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_type"])
    return funnel_counts(ev, "user_id", "ts",
                         ["signup", "purchase", "error"])


def _q_pareto_orders(sf_dir):
    """2-D SKYLINE: orders not dominated on (max price, min date) — the
    Pareto-frontier operator.  Per-block frontier combiner shrinks each
    block before any movement; 16-way tree fold; no all-to-all."""
    import ray.data

    from engine.ops.skyline import skyline

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_totalprice", "o_orderdate"])
    return skyline(orders, "o_totalprice", "o_orderdate",
                   ["o_orderkey", "o_totalprice", "o_orderdate"])


def _q_crosstab_hours(sf_dir):
    """Contingency table event_type × hour-of-day with expected counts
    and standardized residuals — every float is a per-row expression
    over exact integer marginals (no order-dependent float sums)."""
    import ray.data

    from engine.ops.stats import crosstab_residuals

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"])

    def add_hour(b: pa.Table) -> pa.Table:
        t = b["ts"].combine_chunks()
        if pa.types.is_timestamp(t.type):
            t = t.cast(pa.int64())
        us = t.to_numpy(zero_copy_only=False)
        hr = (us // 3_600_000_000) % 24
        return pa.table({"event_type": b["event_type"],
                         "hr": pa.array(hr.astype(np.int64))})

    return crosstab_residuals(
        ev.map_batches(add_hour, batch_format="pyarrow", batch_size=None,
                       zero_copy_batch=True),
        "event_type", "hr")


_PII_RE = r"\b(customer|key|value)\b"


def _q_pii_redact(sf_dir):
    """PII / sensitive-term REDACTION — the rewrite stage of a curation
    pipeline: one streaming pass, vectorized RE2 global replace +
    match count over the Arrow string buffer (pyarrow and DuckDB both
    embed RE2, so regexp_replace(...,'g') rewrites identical spans)."""
    from engine.ops import text

    return (_docs(sf_dir)
            .select_columns(["doc_id", "text"])
            .map_batches(lambda b: text.redact(b, _PII_RE, "<PII>"),
                         batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True)
            .select_columns(["doc_id", "redacted", "n_redacted"]))


def _q_mix_sources(sf_dir):
    """WEIGHTED SOURCE MIXING — deterministic per-source Bernoulli
    downsampling (keep 25% of src0, 50% of src1, 75% of src2, ~all of
    the rest): the dataset-mixing op of a training-data pipeline.  The
    keep decision is a pure function of md5(doc_id)'s first byte, so
    the sample is reproducible on any cluster size / partitioning; the
    SQL oracle mirrors it with a lexicographic hex compare."""
    from engine.ops.text import weighted_mix_mask

    rates = {"src0": "40", "src1": "80", "src2": "c0"}

    def flt(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids = pc.cast(batch["doc_id"], pa.string())
        keep = weighted_mix_mask(ids, batch["source"], rates)
        return batch.filter(pa.array(keep))

    return (_docs(sf_dir)
            .select_columns(["doc_id", "source"])
            .map_batches(flt, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True))


def _q_doc_dup_stats(sf_dir):
    """Within-document REPETITION quality stats (duplicate-token ratio
    — the repetition filter of a curation pipeline).  Exact distinct
    counting fully vectorized: one split, Arrow dictionary_encode to
    integer codes, distinct (doc, code) pairs via one int64 np.unique;
    dup_ratio is a single fixed float expression over exact ints."""
    from engine.ops.text import dup_stats

    return (_docs(sf_dir)
            .select_columns(["doc_id", "text"])
            .map_batches(dup_stats, batch_format="pyarrow",
                         batch_size=None, zero_copy_batch=True))


def _q_zonal_stats(sf_dir):
    """ZONAL STATISTICS (raster × vector): per-polygon aggregates over
    the DECODED pixels of every image whose geotag the polygon covers.
    Payload-bounded decode batches reduce each image to 4 int64s (bytes
    never ride a shuffle), pairs come from the two-phase cell-prefilter
    + exact PIP join, and the per-polygon rollup is a combiner-first
    tree aggregate.  No SQL oracle (pixel contents aren't
    SQL-expressible); pinned by the brute-force decode parity pytest
    (test_rayds.py::test_zonal_stats_matches_brute)."""
    from engine.rayds.zonal import zonal_stats

    return zonal_stats(sf_dir)


def _q_tile_pyramid(sf_dir):
    """Multi-zoom quadtree TILE PYRAMID (z/x/y counts for zoom 0..6 in
    one job): per-block finest-level counts fold up every coarser zoom
    locally before the single exchange — one scan, one exchange, never
    one scan per level."""
    from engine.rayds.imagetab import image_dataset
    from engine.rayds.pyramid import quad_pyramid

    return quad_pyramid(
        image_dataset(sf_dir).select_columns(["x", "y"]), "x", "y", zmax=6)


def _q_grouped_percentiles(sf_dir):
    """Per-GROUP exact INTERPOLATED quantiles (quantile_cont per
    event_type): the counting decomposition of grouped_quantiles with
    DuckDB's lerp evaluated in the identical double expression order."""
    import ray.data

    from engine.ops.sketch import grouped_quantiles_cont

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"])
    return grouped_quantiles_cont(ev, "event_type", "value",
                                  qs=(0.25, 0.5, 0.9))


def _q_trajectory_stats(sf_dir):
    """Per-user TRAJECTORY statistics over time-ordered geotagged
    events: segment count, travelled distance and net displacement in
    exact SQUARED-INTEGER space (milli-unit coords) — one hash exchange
    on the entity key, vectorized per-partition ordered-diff folds; no
    float sqrt, no order-dependent float SUM, so the window-function
    oracle matches bit-for-bit."""
    import ray.data

    from engine.ops.trajectory import trajectory_stats
    from engine.rayds.imagetab import COORD_MOD, X_MULT, Y_MULT

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id"])

    def coords(b: pa.Table) -> pa.Table:
        eid = b["event_id"].to_numpy()
        return pa.table({
            "user_id": b["user_id"],
            "ts": b["ts"],
            "event_id": b["event_id"],
            "ix": pa.array((eid * X_MULT) % COORD_MOD),
            "iy": pa.array((eid * Y_MULT) % COORD_MOD),
        })

    return trajectory_stats(
        ev.map_batches(coords, batch_format="pyarrow", batch_size=None,
                       zero_copy_batch=True),
        "user_id", ["ts", "event_id"], "ix", "iy")


def _q_rolling_value(sf_dir):
    """ROLLING-FRAME window aggregate (moving average): per user, the
    sum/count/mean of integer cents over the 4-row frame ending at each
    event (ROWS BETWEEN 3 PRECEDING AND CURRENT ROW, ordered by
    (ts, event_id)).  One hash exchange on user_id; per-partition
    lexsort + exact integer cumsum-difference (associative, so exact);
    the float mean is ONE fixed division mirrored by the SQL oracle."""
    import ray.data

    from engine.ops.window import rolling_sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "value"],
    )

    def project(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch["user_id"],
                "ts_us": batch["ts"].cast(pa.int64()),
                "event_id": batch["event_id"],
                "cents": pa.array(
                    np.floor(batch["value"].to_numpy() * 100.0).astype(np.int64)
                ),
            }
        )

    proj = ds.map_batches(project, batch_format="pyarrow", batch_size=None,
                          zero_copy_batch=True)
    return rolling_sum(proj, "user_id", ["ts_us", "event_id"], "cents",
                       preceding=3, id_col="event_id")


def _q_time_window(sf_dir):
    """RANGE-FRAME window aggregate (trailing TIME window, not row
    count): per user, the sum/count of integer cents over the events in
    the last hour ending at each event (SQL ``RANGE BETWEEN 3600000000
    PRECEDING AND CURRENT ROW`` over microsecond timestamps — peers
    with equal ts all share the frame).  One hash exchange on user_id;
    per-partition lexsort + two vectorized searchsorted probes over a
    composite (key_rank, dt) int64 + exact integer cumsum-difference."""
    import ray.data

    from engine.ops.window import time_range_sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "value"],
    )

    def project(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch["user_id"],
                "ts_us": batch["ts"].cast(pa.int64()),
                "event_id": batch["event_id"],
                "cents": pa.array(
                    np.floor(batch["value"].to_numpy() * 100.0).astype(np.int64)
                ),
            }
        )

    proj = ds.map_batches(project, batch_format="pyarrow", batch_size=None,
                          zero_copy_batch=True)
    return time_range_sum(proj, "user_id", "ts_us", "cents",
                          preceding=3_600_000_000, id_col="event_id")


def _q_markov_transitions(sf_dir):
    """First-order Markov TRANSITION MATRIX of the event stream: counts
    of every consecutive (event_type → next event_type) pair within
    each user's (ts, event_id)-ordered sequence — the session-behavior
    transition feature.  ONE hash exchange on user_id (pair counting is
    dictionary-code vector work per partition, ≤ |types|² rows out),
    then a raw-task tree fold of the tiny partial matrices."""
    import ray.data

    from engine.ops.window import markov_transitions

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type"],
    )

    def project(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch["user_id"],
                "ts_us": batch["ts"].cast(pa.int64()),
                "event_id": batch["event_id"],
                "event_type": batch["event_type"],
            }
        )

    proj = ds.map_batches(project, batch_format="pyarrow", batch_size=None,
                          zero_copy_batch=True)
    return markov_transitions(proj, "user_id", ["ts_us", "event_id"],
                              "event_type",
                              out_cols=("prev_type", "next_type", "n"))


def _q_idf_vocab(sf_dir):
    """DOCUMENT-FREQUENCY / IDF VOCABULARY (the TF-IDF corpus pass):
    per-doc DISTINCT words (vectorized dictionary-encode + one
    np.unique per block — each doc is one row, so block-local dedup IS
    global), combiner-first grouped count, then the RATIONAL idf
    (N − df + 0.5)/(df + 0.5) — BM25's idf argument without the libm
    log, so the doubles are bit-identical to the SQL oracle."""
    import pyarrow.parquet as pq

    from engine.ops.text import doc_distinct_words
    from engine.rayds.shuffle import grouped_count

    n_docs = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    words = _docs(sf_dir).select_columns(["text"]).map_batches(
        doc_distinct_words, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True)
    counts = grouped_count(words, ["word"], out_col="df",
                           use_shuffle="auto")

    def add_idf(batch: pa.Table) -> pa.Table:
        df = batch["df"].to_numpy(zero_copy_only=False).astype(np.float64)
        idf = (np.float64(n_docs) - df + 0.5) / (df + 0.5)
        return batch.append_column("idf", pa.array(idf))

    return counts.map_batches(add_idf, batch_format="pyarrow",
                              batch_size=None, zero_copy_batch=True)


def _q_bigram_topk(sf_dir):
    """COLLOCATION MINING: global top-20 consecutive word bigrams —
    offset-arithmetic bigram explode (no row loops), combiner-first
    (w1, w2) counts, distributed sort + limit; deterministic
    lexicographic tie-break mirrored by the oracle."""
    from engine.ops.text import bigram_explode
    from engine.rayds.shuffle import grouped_count

    pairs = _docs(sf_dir).select_columns(["text"]).map_batches(
        bigram_explode, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True)
    counts = grouped_count(pairs, ["w1", "w2"], out_col="cnt",
                           use_shuffle="auto")
    return counts.sort(["cnt", "w1", "w2"],
                       descending=[True, False, False]).limit(20)


def _q_shuffle_positions(sf_dir):
    """DETERMINISTIC GLOBAL TRAINING-DATA SHUFFLE: each doc's 0-based
    position in md5(doc_id) order — reproducible at any cluster size,
    no RNG state.  Vectorized md5 top-64-bit sort key (engine/ops/
    vhash.py), Ray native distributed sort, then the two-phase prefix
    scan assigns global positions (3 ints per block to the driver, no
    second shuffle)."""
    import ray.data

    from engine.ops.scan import shuffle_positions

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id"])
    return shuffle_positions(docs, "doc_id")


def _q_nation_flow(sf_dir):
    """TPC-H Q7-shaped BI-NATION FLOW: supplier-nation → customer-nation
    revenue over a FOUR-WAY join chain (lineitem ⋈ supplier ⋈ orders ⋈
    customer), aggregated on the narrow (s_nationkey, c_nationkey) pair
    BEFORE names attach — the ≤625-row matrix gets its nation names
    from a driver-side scale-invariant dim table, so the fact stream
    never carries strings and the name join costs nothing."""
    import ray.data

    from engine.rayds.shuffle import dim_table, equi_join, grouped_agg

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                 "l_discount"])

    def bp(batch: pa.Table) -> pa.Table:
        v = np.floor(
            batch["l_extendedprice"].to_numpy()
            * (1.0 - batch["l_discount"].to_numpy()) * 10000.0
        ).astype(np.int64)
        return pa.table({"l_orderkey": batch["l_orderkey"],
                         "l_suppkey": batch["l_suppkey"],
                         "_bp": pa.array(v)})

    li = li.map_batches(bp, batch_format="pyarrow", batch_size=None,
                        zero_copy_batch=True)
    supp = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"])
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])

    j1 = equi_join(supp, li, "s_suppkey", "l_suppkey",
                   ["s_nationkey"], ["l_orderkey", "_bp"])
    j2 = equi_join(orders, j1, "o_orderkey", "l_orderkey",
                   ["o_custkey"], ["s_nationkey", "_bp"])
    j3 = equi_join(cust, j2, "c_custkey", "o_custkey",
                   ["c_nationkey"], ["s_nationkey", "_bp"])
    agg = grouped_agg(j3, ["s_nationkey", "c_nationkey"],
                      [("_bp", "sum")], ["revenue_bp"], plan="tree")
    nation = dim_table(f"{sf_dir}/nation.parquet",
                       ["n_nationkey", "n_name"])
    names = {int(k): v for k, v in
             zip(nation["n_nationkey"].to_pylist(),
                 nation["n_name"].to_pylist())}

    def attach(batch: pa.Table) -> pa.Table:
        s = batch["s_nationkey"].to_numpy(zero_copy_only=False)
        c = batch["c_nationkey"].to_numpy(zero_copy_only=False)
        keep = s != c
        s, c = s[keep], c[keep]
        rev = batch["revenue_bp"].to_numpy(zero_copy_only=False)[keep]
        return pa.table({
            "supp_nation": pa.array([names[int(v)] for v in s],
                                    type=pa.string()),
            "cust_nation": pa.array([names[int(v)] for v in c],
                                    type=pa.string()),
            "revenue_bp": pa.array(rev.astype(np.int64)),
        })

    return agg.map_batches(attach, batch_format="pyarrow",
                           batch_size=None)


def _q_anomaly_zscore(sf_dir):
    """Per-user z-score OUTLIER EVENTS (|value − μ_user| > 3σ_user),
    decided EXACTLY in integer arithmetic — the flag test is
    |n·x − Σy| > isqrt(9·(n·Σyy − Σy²)), one exact isqrt per user on
    the driver, a pure int64 vector compare per event; the SQL oracle
    states the same inequality squared in HUGEINT."""
    import ray.data

    from engine.ops.stats import grouped_zscore_outliers

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "value"])
    return grouped_zscore_outliers(ev, "user_id", "value",
                                   id_cols=["event_id"], scale=100, z=3)


def _q_cohort_retention(sf_dir):
    """COHORT RETENTION MATRIX: users bucketed by first-active day,
    distinct-user counts per (cohort_day, offset_days).  ONE exchange
    on user_id (per-partition: lexsort, distinct (user, day) runs,
    cohort = first-of-run, all offset emission vectorized); each
    (user, cohort, offset) is globally unique after the per-user
    dedup, so the final combiner-first count IS the distinct-user
    count — no COUNT DISTINCT machinery needed."""
    import ray.data

    from engine.rayds.shuffle import grouped_count, hash_exchange_groups

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts"])

    def project(batch: pa.Table) -> pa.Table:
        day = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False) \
            // 86_400_000_000
        return pa.table({"user_id": batch["user_id"],
                         "day": pa.array(day.astype(np.int64))})

    proj = ds.map_batches(project, batch_format="pyarrow",
                          batch_size=None, zero_copy_batch=True)

    def part_fn(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_part"])
        if g.num_rows == 0:
            return pa.table({"cohort_day": pa.array([], type=pa.int64()),
                             "offset_days": pa.array([], type=pa.int64())})
        u = g["user_id"].to_numpy(zero_copy_only=False)
        d = g["day"].to_numpy(zero_copy_only=False)
        order = np.lexsort((d, u))
        u, d = u[order], d[order]
        keep = np.r_[True, (u[1:] != u[:-1]) | (d[1:] != d[:-1])]
        u, d = u[keep], d[keep]
        new = np.r_[True, u[1:] != u[:-1]]
        # day is ascending within each user run → first-of-run = min
        cohort = np.repeat(d[new], np.diff(np.append(
            np.nonzero(new)[0], len(u))))
        return pa.table({"cohort_day": pa.array(cohort),
                         "offset_days": pa.array(d - cohort)})

    pairs = hash_exchange_groups(proj, ["user_id"], part_fn, 64)
    return grouped_count(pairs, ["cohort_day", "offset_days"],
                         out_col="users", use_shuffle="auto")


def _q_copurchase_topk(sf_dir):
    """MARKET-BASKET top-20 co-purchased part pairs: one exchange on
    l_orderkey co-locates each order's lines, the quadratic pair
    explode is pure offset arithmetic bounded by basket size, counting
    is combiner-first, deterministic lexicographic tie-break."""
    import ray.data

    from engine.ops.basket import cooccur_pairs
    from engine.rayds.shuffle import grouped_count

    li = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_orderkey", "l_partkey"])
    pairs = cooccur_pairs(li, "l_orderkey", "l_partkey",
                          out_cols=("p1", "p2"))
    counts = grouped_count(pairs, ["p1", "p2"], out_col="cnt",
                           use_shuffle="auto")
    return counts.sort(["cnt", "p1", "p2"],
                       descending=[True, False, False]).limit(20)


def _q_big_orders(sf_dir):
    """TPC-H Q18-shaped GROUP-HAVING + JOIN-BACK: orders whose total
    line quantity exceeds 180, enriched with customer name and order
    date.  The quantity rollup is combiner-first over the engine's own
    hash exchange (orderkey cardinality scales with the data); the
    HAVING filter shrinks the stream BEFORE the two adaptive join-backs
    (the filtered side rides the broadcast plan while it fits)."""
    import ray.data

    from engine.rayds.shuffle import equi_join, grouped_agg

    li = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_orderkey", "l_quantity"])

    def qty(batch: pa.Table) -> pa.Table:
        q = np.rint(batch["l_quantity"].to_numpy(
            zero_copy_only=False)).astype(np.int64)
        return pa.table({"l_orderkey": batch["l_orderkey"],
                         "_q": pa.array(q)})

    li = li.map_batches(qty, batch_format="pyarrow", batch_size=None,
                        zero_copy_batch=True)
    tot = grouped_agg(li, ["l_orderkey"], [("_q", "sum")],
                      ["total_qty"], plan="shuffle")

    def having(batch: pa.Table) -> pa.Table:
        keep = batch["total_qty"].to_numpy(zero_copy_only=False) > 180
        return batch.filter(pa.array(keep))

    big = tot.map_batches(having, batch_format="pyarrow",
                          batch_size=None, zero_copy_batch=True)
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def odate(batch: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": batch["o_orderkey"],
            "o_custkey": batch["o_custkey"],
            "o_date_us": batch["o_orderdate"].cast(pa.int64()),
        })

    orders = orders.map_batches(odate, batch_format="pyarrow",
                                batch_size=None, zero_copy_batch=True)
    j1 = equi_join(big, orders, "l_orderkey", "o_orderkey",
                   ["total_qty"], ["o_custkey", "o_date_us"])
    # join output key is the canonical "_k" — rebadge it before chaining
    j1 = j1.map_batches(
        lambda b: b.rename_columns(
            ["o_orderkey" if c == "_k" else c for c in b.column_names]),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    cust = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                 columns=["c_custkey", "c_name"])
    j2 = equi_join(j1, cust, "o_custkey", "c_custkey",
                   ["o_orderkey", "total_qty", "o_date_us"], ["c_name"])
    return j2.map_batches(
        lambda b: b.rename_columns(
            ["o_custkey" if c == "_k" else c for c in b.column_names])
                 .select(["c_name", "o_custkey", "o_orderkey",
                          "o_date_us", "total_qty"]),
        batch_format="pyarrow", batch_size=None)


def _q_tfidf_topterms(sf_dir):
    """Per-document TOP-3 TF-IDF TERMS: block-exact term frequencies
    (each doc is one row), document frequencies from the distinct-words
    pipeline, tf ⋈ df on word through the adaptive equi-join, score =
    tf · rational-idf (no libm log — bit-identical doubles), then ONE
    exchange on doc_id for the per-doc top-3 (score DESC, word ASC
    tie-break, mirrored by the oracle's row_number)."""
    import pyarrow.parquet as pq

    from engine.ops.text import doc_distinct_words, doc_term_freqs
    from engine.rayds.shuffle import (equi_join, grouped_count,
                                      hash_exchange_groups)

    n_docs = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    docs = _docs(sf_dir).select_columns(["doc_id", "text"])
    tf = docs.map_batches(doc_term_freqs, batch_format="pyarrow",
                          batch_size=None, zero_copy_batch=True)
    dw = docs.select_columns(["text"]).map_batches(
        doc_distinct_words, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True)
    df = grouped_count(dw, ["word"], out_col="df", use_shuffle="auto")
    joined = equi_join(df, tf, "word", "word", ["df"], ["doc_id", "tf"])

    def score(batch: pa.Table) -> pa.Table:
        dfv = batch["df"].to_numpy(zero_copy_only=False).astype(np.float64)
        tfv = batch["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        idf = (np.float64(n_docs) - dfv + 0.5) / (dfv + 0.5)
        return pa.table({"doc_id": batch["doc_id"],
                         "word": batch["_k"],
                         "tf": batch["tf"],
                         "score": pa.array(tfv * idf)})

    scored = joined.map_batches(score, batch_format="pyarrow",
                                batch_size=None)

    def top3(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_part"])
        if g.num_rows == 0:
            return g.append_column("rank", pa.array([], type=pa.int64()))
        d = g["doc_id"].to_numpy(zero_copy_only=False)
        s = g["score"].to_numpy(zero_copy_only=False)
        # fixed-width unicode dtype: C-speed comparisons, and numpy's
        # code-point order == DuckDB's byte order (both monotonic)
        w = np.asarray(g["word"].to_pylist(), dtype=str)
        order = np.lexsort((w, -s, d))
        d = d[order]
        new = np.r_[True, d[1:] != d[:-1]]
        starts = np.nonzero(new)[0]
        pos = np.arange(len(d)) - np.repeat(starts, np.diff(
            np.append(starts, len(d))))
        keep = pos < 3
        sel = pa.array(order[keep])
        return pa.table({
            "doc_id": g["doc_id"].take(sel),
            "word": g["word"].take(sel),
            "tf": g["tf"].take(sel),
            "score": g["score"].take(sel),
            "rank": pa.array((pos[keep] + 1).astype(np.int64)),
        })

    return hash_exchange_groups(scored, ["doc_id"], top3, 64)


def _q_followup_pairs(sf_dir):
    """WINDOWED EVENT CO-OCCURRENCE: counts of (event_type →
    event_type within the next 30 min of the same user) — the
    behavioral-sequence feature that generalizes the Markov next-1
    transition to a time window.  One exchange; per-partition forward
    searchsorted over the composite key + offset-arithmetic pair
    explode; ≤ |types|² partials fold on the driver."""
    import ray.data

    from engine.ops.window import windowed_followups

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type"])

    def project(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch["user_id"],
            "ts_us": batch["ts"].cast(pa.int64()),
            "event_id": batch["event_id"],
            "event_type": batch["event_type"],
        })

    proj = ds.map_batches(project, batch_format="pyarrow",
                          batch_size=None, zero_copy_batch=True)
    return windowed_followups(proj, "user_id", "ts_us", "event_id",
                              "event_type", window=1_800_000_000,
                              out_cols=("t1", "t2", "n"))


def _q_part_order_hist(sf_dir):
    """DEGREE HISTOGRAM of the part↔order bipartite graph: how many
    parts appear in exactly k orders.  Two combiner-first counts: the
    distinct-pair dedup doubles as the degree count (each surviving
    row is one distinct order per part), then a tiny histogram
    rollup."""
    import ray.data

    from engine.rayds.shuffle import grouped_count

    li = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_partkey", "l_orderkey"])
    pairs = grouped_count(li, ["l_partkey", "l_orderkey"],
                          out_col="_dup", use_shuffle="auto")
    deg = grouped_count(pairs.select_columns(["l_partkey"]),
                        ["l_partkey"], out_col="n_orders",
                        use_shuffle="auto")
    return grouped_count(deg.select_columns(["n_orders"]),
                         ["n_orders"], out_col="n_parts",
                         use_shuffle="auto")


def _q_dau_wau(sf_dir):
    """DAU / WAU STICKINESS: distinct users per day and per 7-day
    week, ratio per day.  Distinct (user, day) and (user, week) via
    the pair-dedup counts; the weekly table is calendar-bounded (not
    data-bounded), so it broadcasts as a driver dict into the final
    vectorized map."""
    import ray.data

    from engine.rayds.shuffle import grouped_count

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts"])

    def project(batch: pa.Table) -> pa.Table:
        day = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False) \
            // 86_400_000_000
        return pa.table({"user_id": batch["user_id"],
                         "day": pa.array(day.astype(np.int64))})

    proj = ds.map_batches(project, batch_format="pyarrow",
                          batch_size=None, zero_copy_batch=True)
    ud = grouped_count(proj, ["user_id", "day"], out_col="_d",
                       use_shuffle="auto")
    dau = grouped_count(ud.select_columns(["day"]), ["day"],
                        out_col="dau", use_shuffle="auto")

    def to_week(batch: pa.Table) -> pa.Table:
        wk = batch["day"].to_numpy(zero_copy_only=False) // 7
        return pa.table({"user_id": batch["user_id"],
                         "week": pa.array(wk.astype(np.int64))})

    uw = grouped_count(
        ud.map_batches(to_week, batch_format="pyarrow", batch_size=None),
        ["user_id", "week"], out_col="_w", use_shuffle="auto")
    wau_rows = grouped_count(uw.select_columns(["week"]), ["week"],
                             out_col="wau", use_shuffle="auto").take_all()
    wau = {int(r["week"]): int(r["wau"]) for r in wau_rows}

    def attach(batch: pa.Table) -> pa.Table:
        day = batch["day"].to_numpy(zero_copy_only=False)
        d = batch["dau"].to_numpy(zero_copy_only=False).astype(np.int64)
        wk = day // 7
        w = np.array([wau[int(x)] for x in wk], dtype=np.int64)
        return pa.table({
            "day": batch["day"], "dau": pa.array(d),
            "week": pa.array(wk.astype(np.int64)), "wau": pa.array(w),
            "stickiness": pa.array(d.astype(np.float64)
                                   / w.astype(np.float64)),
        })

    return dau.map_batches(attach, batch_format="pyarrow",
                           batch_size=None)


def _q_monthly_growth(sf_dir):
    """MONTH-OVER-MONTH REVENUE GROWTH: calendar-month revenue rollup
    (combiner-first, months-since-epoch int key via numpy datetime64
    truncation — mirrored by (year−1970)·12 + month−1 in SQL), then
    lag/delta/pct on the calendar-bounded month table driver-side.
    pct is ONE float division of exact integer cents."""
    import ray.data

    from engine.rayds.shuffle import grouped_agg

    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_orderdate", "o_totalprice"])

    def project(batch: pa.Table) -> pa.Table:
        us = batch["o_orderdate"].cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        month = us.astype("datetime64[us]").astype("datetime64[M]") \
            .astype(np.int64)
        cents = np.rint(batch["o_totalprice"].to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)
        return pa.table({"month_idx": pa.array(month),
                         "_c": pa.array(cents)})

    proj = orders.map_batches(project, batch_format="pyarrow",
                              batch_size=None, zero_copy_batch=True)
    agg = grouped_agg(proj, ["month_idx"], [("_c", "sum")],
                      ["revenue_c"], plan="tree")
    t = pa.concat_tables(
        [b for b in agg.iter_batches(batch_format="pyarrow")])
    m = t["month_idx"].to_numpy(zero_copy_only=False)
    r = t["revenue_c"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(m)
    m, r = m[order], r[order]
    prev = r[:-1]
    cur = r[1:]
    delta = cur - prev
    pct = delta.astype(np.float64) / prev.astype(np.float64)
    return pa.table({
        "month_idx": pa.array(m[1:]),
        "revenue_c": pa.array(cur),
        "prev_c": pa.array(prev),
        "delta_c": pa.array(delta),
        "pct": pa.array(pct),
    })


def _q_value_histogram(sf_dir):
    """FIXED-WIDTH HISTOGRAM of events.value (20 buckets over the
    exact global [min, max]): pass 1 = per-block minmax partials
    (tree-folded, ≤2 doubles per block to the driver), pass 2 =
    combiner-first bucket counts.  The bucket expression
    ⌊(v − mn)·20/(mx − mn)⌋ clamped to 19 is evaluated in the same
    IEEE order on both sides."""
    import ray.data

    from engine.rayds.shuffle import grouped_count

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["value"])

    def minmax(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"mn": pa.array([], type=pa.float64()),
                             "mx": pa.array([], type=pa.float64())})
        v = batch["value"].to_numpy(zero_copy_only=False)
        return pa.table({"mn": pa.array([float(v.min())]),
                         "mx": pa.array([float(v.max())])})

    parts = ds.map_batches(minmax, batch_format="pyarrow",
                           batch_size=None,
                           zero_copy_batch=True).take_all()
    mn = min(r["mn"] for r in parts)
    mx = max(r["mx"] for r in parts)

    def bucket(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        b = np.floor((v - mn) * 20.0 / (mx - mn)).astype(np.int64)
        b = np.minimum(b, 19)
        return pa.table({"bucket": pa.array(b)})

    buckets = ds.map_batches(bucket, batch_format="pyarrow",
                             batch_size=None, zero_copy_batch=True)
    return grouped_count(buckets, ["bucket"], out_col="n",
                         use_shuffle="auto")


def _q_first_touch(sf_dir):
    """FIRST-TOUCH ATTRIBUTION: users bucketed by their FIRST event's
    type ((ts, event_id) order), with the count of those who ever
    purchased.  ONE exchange on user_id co-locates each user's events;
    the per-partition first-of-run + any-purchase reduction is pure
    vector work emitting ≤ |types| partial rows, folded on the
    driver."""
    import pyarrow.compute as pc
    import ray.data

    from engine.rayds.shuffle import hash_exchange_groups, tree_fold_refs

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type"])

    def project(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch["user_id"],
            "ts_us": batch["ts"].cast(pa.int64()),
            "event_id": batch["event_id"],
            "event_type": batch["event_type"],
        })

    proj = ds.map_batches(project, batch_format="pyarrow",
                          batch_size=None, zero_copy_batch=True)

    def part_fn(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_part"])
        if g.num_rows == 0:
            return pa.table({
                "first_type": pa.array([], type=pa.string()),
                "n_users": pa.array([], type=pa.int64()),
                "n_converted": pa.array([], type=pa.int64())})
        u = g["user_id"].to_numpy(zero_copy_only=False)
        ts = g["ts_us"].to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, u))
        u = u[order]
        et = g["event_type"].take(pa.array(order))
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        is_buy = pc.equal(et, "purchase").to_numpy(zero_copy_only=False)
        new = np.r_[True, u[1:] != u[:-1]]
        starts = np.nonzero(new)[0]
        ends = np.append(starts[1:], len(u))
        conv = (np.add.reduceat(is_buy.astype(np.int64), starts)
                > 0).astype(np.int64)
        first = et.take(pa.array(starts))
        enc = pc.dictionary_encode(first)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        nt = len(enc.dictionary)
        n_users = np.bincount(codes, minlength=nt).astype(np.int64)
        n_conv = np.bincount(codes, weights=conv,
                             minlength=nt).astype(np.int64)
        return pa.table({"first_type": enc.dictionary,
                         "n_users": pa.array(n_users),
                         "n_converted": pa.array(n_conv)})

    partials = hash_exchange_groups(proj, ["user_id"], part_fn, 64)

    def combine(tbls: list[pa.Table]) -> pa.Table:
        t = pa.concat_tables(tbls, promote_options="permissive")
        if t.num_rows == 0:
            return tbls[0]
        gb = t.group_by(["first_type"]).aggregate(
            [("n_users", "sum"), ("n_converted", "sum")])
        return gb.rename_columns(["first_type", "n_users", "n_converted"])

    return tree_fold_refs(partials, combine)


def _q_cube_counts(sf_dir):
    """CUBE / GROUPING-SETS rollup: event counts by (event_type,
    weekday) plus all three margins — derived entirely from the base
    cell counts (ONE combiner-first count over the data; the cube
    expansion touches ≤ |types|·7 rows on the driver, never the
    events).  'ALL' sentinels instead of SQL NULLs keep the value
    hash well-defined."""
    import ray.data

    from engine.rayds.shuffle import grouped_count

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "event_type"])

    def project(batch: pa.Table) -> pa.Table:
        day = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False) \
            // 86_400_000_000
        wd = ((day + 4) % 7).astype(np.int64)
        return pa.table({"event_type": batch["event_type"],
                         "wd": pa.array(wd)})

    proj = ds.map_batches(project, batch_format="pyarrow",
                          batch_size=None, zero_copy_batch=True)
    base = grouped_count(proj, ["event_type", "wd"], out_col="n",
                         use_shuffle="auto").take_all()
    from collections import defaultdict

    cells = defaultdict(int)
    for r in base:
        et, wd, n = r["event_type"], str(r["wd"]), int(r["n"])
        cells[(et, wd)] += n
        cells[(et, "ALL")] += n
        cells[("ALL", wd)] += n
        cells[("ALL", "ALL")] += n
    ks = sorted(cells)
    return pa.table({
        "event_type": pa.array([k[0] for k in ks], type=pa.string()),
        "weekday": pa.array([k[1] for k in ks], type=pa.string()),
        "n": pa.array([cells[k] for k in ks], type=pa.int64()),
    })


def _q_user_running_total(sf_dir):
    """Per-user CUMULATIVE spend (ROWS UNBOUNDED PRECEDING window) —
    completes the frame family next to rolling_value (ROWS k) and
    time_window (RANGE).  One exchange; per-partition lexsort + one
    cumsum with per-run rebasing."""
    import ray.data

    from engine.ops.window import running_total

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "value"])

    def project(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch["user_id"],
            "ts_us": batch["ts"].cast(pa.int64()),
            "event_id": batch["event_id"],
            "cents": pa.array(np.rint(
                batch["value"].to_numpy(zero_copy_only=False) * 100.0
            ).astype(np.int64)),
        })

    proj = ds.map_batches(project, batch_format="pyarrow",
                          batch_size=None, zero_copy_batch=True)
    return running_total(proj, "user_id", "ts_us", "event_id", "cents",
                         out_col="running")


def _q_centroid_by_label(sf_dir):
    """PER-LABEL EMBEDDING CENTROIDS (the class-prototype op) with ZERO
    shuffles: per-block integer micro-unit sums over the ListArray's
    flat values buffer (one np.add.at on a label·dim composite — no
    per-vector Python), tree-folded; mean is one float division of
    exact integers, mirrored by the oracle's unnest."""
    import ray.data

    from engine.ops.vecagg import grouped_vector_mean

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["label", "embedding"])
    return grouped_vector_mean(ds, "label", "embedding")


def _q_order_gap_hist(sf_dir):
    """INTER-ARRIVAL HISTOGRAM: distribution of day gaps between a
    customer's consecutive orders.  One exchange on o_custkey;
    per-partition lexsort + vectorized consecutive diff; the gap rows
    (≤ orders) flow into a combiner-first count."""
    import ray.data

    from engine.rayds.shuffle import grouped_count, hash_exchange_groups

    ds = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                               columns=["o_custkey", "o_orderdate",
                                        "o_orderkey"])

    def project(batch: pa.Table) -> pa.Table:
        day = batch["o_orderdate"].cast(pa.int64()).to_numpy(
            zero_copy_only=False) // 86_400_000_000
        return pa.table({"cust": batch["o_custkey"],
                         "day": pa.array(day.astype(np.int64)),
                         "okey": batch["o_orderkey"]})

    proj = ds.map_batches(project, batch_format="pyarrow",
                          batch_size=None, zero_copy_batch=True)

    def part_fn(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_part"])
        if g.num_rows < 2:
            return pa.table({"gap_days": pa.array([], type=pa.int64())})
        c = g["cust"].to_numpy(zero_copy_only=False)
        d = g["day"].to_numpy(zero_copy_only=False)
        k = g["okey"].to_numpy(zero_copy_only=False)
        order = np.lexsort((k, d, c))
        c, d = c[order], d[order]
        same = c[1:] == c[:-1]
        return pa.table({"gap_days": pa.array((d[1:] - d[:-1])[same])})

    gaps = hash_exchange_groups(proj, ["cust"], part_fn, 64)
    return grouped_count(gaps, ["gap_days"], out_col="n",
                         use_shuffle="auto")


def _q_common_paths(sf_dir):
    """TOP-10 CLICKSTREAM PATHS: each user's ordered event-type string
    (the grouped_string_agg kernel), then a combiner-first count over
    whole paths + distributed sort/limit — 'what are the most common
    user journeys'."""
    import ray.data

    from engine.ops.window import grouped_string_agg
    from engine.rayds.shuffle import grouped_count

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type"])

    def project(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch["user_id"],
            "ts_us": batch["ts"].cast(pa.int64()),
            "event_id": batch["event_id"],
            "event_type": batch["event_type"],
        })

    proj = ds.map_batches(project, batch_format="pyarrow",
                          batch_size=None, zero_copy_batch=True)
    paths = grouped_string_agg(proj, "user_id", ["ts_us", "event_id"],
                               "event_type", sep=",", out_col="path")
    counts = grouped_count(paths.select_columns(["path"]), ["path"],
                           out_col="n_users", use_shuffle="auto")
    return counts.sort(["n_users", "path"],
                       descending=[True, False]).limit(10)


def _q_cell_density_stats(sf_dir):
    """SPATIAL DENSITY SUMMARY: distribution stats (cells, min, max,
    total, lower median) over the per-cell image counts.  The count
    table is world-bounded (≤ (extent/cell)² cells no matter the data
    volume), so the distributed count folds to a driver-side summary —
    the 'how skewed is my spatial partitioning' diagnostic."""
    from engine.rayds import pipeline, shuffle

    enc = pipeline.encoded_dataset(sf_dir).select_columns(["cell"])
    counts = shuffle.grouped_count(enc, ["cell"], out_col="n_images")
    rows = counts.take_all()
    n = np.sort(np.array([r["n_images"] for r in rows], dtype=np.int64))
    return pa.table({
        "n_cells": pa.array([len(n)], type=pa.int64()),
        "min_n": pa.array([int(n[0])], type=pa.int64()),
        "max_n": pa.array([int(n[-1])], type=pa.int64()),
        "total": pa.array([int(n.sum())], type=pa.int64()),
        "med_n": pa.array([int(n[(len(n) - 1) // 2])], type=pa.int64()),
    })


def _q_lift_pairs(sf_dir):
    """ASSOCIATION-RULE MINING: top-20 co-purchased part pairs by LIFT
    (n_ab·N / (n_a·n_b)) with a support floor — the market-basket
    follow-up to raw pair counts.  Pair and item counts are
    combiner-first; the two count attachments ride the adaptive
    equi-join; lift is ONE double division of exact int64 products."""
    import ray.data

    from engine.ops.basket import cooccur_pairs
    from engine.rayds.shuffle import grouped_count

    li = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_orderkey", "l_partkey"])
    pairs = cooccur_pairs(li, "l_orderkey", "l_partkey",
                          out_cols=("p1", "p2"))
    ab = grouped_count(pairs, ["p1", "p2"], out_col="n_ab",
                       use_shuffle="auto")

    def support(batch: pa.Table) -> pa.Table:
        keep = batch["n_ab"].to_numpy(zero_copy_only=False) >= 3
        return batch.filter(pa.array(keep))

    ab = ab.map_batches(support, batch_format="pyarrow",
                        batch_size=None, zero_copy_batch=True)
    # item counts (distinct orders per part) + order count from ONE
    # order-keyed exchange: a whole order lands in exactly one
    # partition, so per-partition distinct counts are DISJOINT and the
    # driver fold is exact — the vocabulary-sized result broadcasts,
    # replacing the old po/ca/n_orders exchanges + two count-attach
    # equi-joins (each a ~1 s fixed-cost Dataset execution here)
    import ray as _ray

    from engine.rayds.shuffle import hash_exchange_groups

    def part_counts(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_part"])
        if g.num_rows == 0:
            return pa.table({"part": pa.array([], type=pa.int64()),
                             "cnt": pa.array([], type=pa.int64())})
        ok = g["l_orderkey"].to_numpy()
        pk = g["l_partkey"].to_numpy()
        order = np.lexsort((pk, ok))
        oks, pks = ok[order], pk[order]
        uniq = np.r_[True, (oks[1:] != oks[:-1]) | (pks[1:] != pks[:-1])]
        pku = pks[uniq]
        parts, cnts = np.unique(pku, return_counts=True)
        n_ord = len(np.unique(oks))
        return pa.table({
            "part": pa.array(np.r_[parts, [-1]]),
            "cnt": pa.array(np.r_[cnts.astype(np.int64), [n_ord]]),
        })

    pc_parts = hash_exchange_groups(li, ["l_orderkey"], part_counts, 64)
    # BUDGET-GUARDED driver fold (same pattern as _q_spearman_corr):
    # the partials are part-vocabulary-sized per partition; past the
    # budget the retained grouped_count + equi_join plan below applies
    # instead of an unbounded driver materialization.
    budget_ok = True
    toks, cnts, tot = [], [], 0
    for b in pc_parts.iter_batches(batch_format="pyarrow"):
        toks.append(b["part"].to_numpy())
        cnts.append(b["cnt"].to_numpy())
        tot += len(b)
        if tot > _FOLD_BUDGET:
            budget_ok = False
            break
    if budget_ok:
        tk = np.concatenate(toks) if toks else np.empty(0, np.int64)
        cn = np.concatenate(cnts) if cnts else np.empty(0, np.int64)
        n_orders = int(cn[tk == -1].sum())
        keep = tk != -1
        tk, cn = tk[keep], cn[keep]
        o = np.argsort(tk, kind="stable")
        tk, cn = tk[o], cn[o]
        s = np.flatnonzero(np.r_[True, tk[1:] != tk[:-1]])
        item_keys = tk[s]
        item_cnts = np.add.reduceat(cn, s) if len(tk) else cn
        iref = _ray.put((item_keys, item_cnts))

        def lift(batch: pa.Table) -> pa.Table:
            from engine.rayds.bcast import cached

            keys, vals = cached(iref)
            n_ab = batch["n_ab"].to_numpy(zero_copy_only=False)
            p1 = batch["p1"].to_numpy(zero_copy_only=False)
            p2 = batch["p2"].to_numpy(zero_copy_only=False)
            n_a = vals[np.searchsorted(keys, p1)]
            n_b = vals[np.searchsorted(keys, p2)]
            v = ((n_ab * np.int64(n_orders)).astype(np.float64)
                 / (n_a * n_b).astype(np.float64))
            return pa.table({"p1": batch["p1"], "p2": batch["p2"],
                             "n_ab": pa.array(n_ab.astype(np.int64)),
                             "lift": pa.array(v)})

        scored = ab.map_batches(lift, batch_format="pyarrow",
                                batch_size=None)
    else:
        # join plan: distinct (part, order) once, item counts + N via
        # combiner-first grouped counts, counts attach through the
        # adaptive equi-join — every stage distributed and bounded
        from engine.rayds.shuffle import equi_join

        po = grouped_count(li, ["l_partkey", "l_orderkey"], out_col="_d",
                           use_shuffle="auto")
        ca = grouped_count(po.select_columns(["l_partkey"]),
                           ["l_partkey"], out_col="n_item",
                           use_shuffle="auto")
        n_orders = grouped_count(
            li.select_columns(["l_orderkey"]), ["l_orderkey"],
            out_col="_o", use_shuffle="auto").count()

        j1 = equi_join(ca, ab, "l_partkey", "p1", ["n_item"],
                       ["p2", "n_ab"])
        j1 = j1.map_batches(
            lambda b: b.rename_columns(
                [{"_k": "p1", "n_item": "n_a"}.get(c, c)
                 for c in b.column_names]),
            batch_format="pyarrow", batch_size=None,
            zero_copy_batch=True)
        j2 = equi_join(ca, j1, "l_partkey", "p2", ["n_item"],
                       ["p1", "n_a", "n_ab"])

        def lift_j(batch: pa.Table) -> pa.Table:
            n_ab = batch["n_ab"].to_numpy(zero_copy_only=False)
            n_a = batch["n_a"].to_numpy(zero_copy_only=False)
            n_b = batch["n_item"].to_numpy(zero_copy_only=False)
            v = ((n_ab * np.int64(n_orders)).astype(np.float64)
                 / (n_a * n_b).astype(np.float64))
            return pa.table({"p1": batch["p1"], "p2": batch["_k"],
                             "n_ab": pa.array(n_ab.astype(np.int64)),
                             "lift": pa.array(v)})

        scored = j2.map_batches(lift_j, batch_format="pyarrow",
                                batch_size=None)

    # top-20 by (lift DESC, p1, p2): per-block top-20 combiner + tree
    # fold instead of Ray's range-partitioned sort all-to-all — exact
    # because block-local top-k under the full tie-broken order is a
    # sound partial of the global top-k
    def block_topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows <= 20:
            return batch
        v = batch["lift"].to_numpy(zero_copy_only=False)
        p1 = batch["p1"].to_numpy(zero_copy_only=False)
        p2 = batch["p2"].to_numpy(zero_copy_only=False)
        sel = np.lexsort((p2, p1, -v))[:20]
        return batch.take(pa.array(sel))

    from engine.rayds.shuffle import tree_fold_refs

    def fold(tbls: list[pa.Table]) -> pa.Table:
        return block_topk(pa.concat_tables(tbls).combine_chunks())

    top = tree_fold_refs(
        scored.map_batches(block_topk, batch_format="pyarrow",
                           batch_size=None, zero_copy_batch=True), fold)
    order = np.lexsort((top["p2"].to_numpy(zero_copy_only=False),
                        top["p1"].to_numpy(zero_copy_only=False),
                        -top["lift"].to_numpy(zero_copy_only=False)))
    return top.take(pa.array(order[:20]))


def _q_region_top_customers(sf_dir):
    """PER-REGION TOP-3 CUSTOMERS by lifetime spend: customer rollup
    over the engine's hash exchange (custkey cardinality scales), the
    region attaches from driver-side scale-invariant dims (nation ⋈
    region pre-joined, 25 rows), then ONE fine-grained exchange on the
    5 region keys for the windowed top-3 (spend DESC, custkey ASC)."""
    import ray.data

    from engine.rayds.shuffle import (dim_table, equi_join, grouped_agg,
                                      hash_exchange_fine_groups)

    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_custkey", "o_totalprice"])

    def cents(batch: pa.Table) -> pa.Table:
        c = np.rint(batch["o_totalprice"].to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)
        return pa.table({"o_custkey": batch["o_custkey"],
                         "_c": pa.array(c)})

    proj = orders.map_batches(cents, batch_format="pyarrow",
                              batch_size=None, zero_copy_batch=True)
    spend = grouped_agg(proj, ["o_custkey"], [("_c", "sum")],
                        ["spend_c"], plan="shuffle")
    cust = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                 columns=["c_custkey", "c_nationkey"])
    j1 = equi_join(spend, cust, "o_custkey", "c_custkey",
                   ["spend_c"], ["c_nationkey"])
    nation = dim_table(f"{sf_dir}/nation.parquet",
                       ["n_nationkey", "n_regionkey"])
    region = dim_table(f"{sf_dir}/region.parquet",
                       ["r_regionkey", "r_name"])
    rname = {int(nk): rn for nk, rk in
             zip(nation["n_nationkey"].to_pylist(),
                 nation["n_regionkey"].to_pylist())
             for rk2, rn in zip(region["r_regionkey"].to_pylist(),
                                region["r_name"].to_pylist())
             if rk == rk2}

    def attach(batch: pa.Table) -> pa.Table:
        nk = batch["c_nationkey"].to_numpy(zero_copy_only=False)
        return pa.table({
            "r_name": pa.array([rname[int(v)] for v in nk],
                               type=pa.string()),
            "c_custkey": batch["_k"],
            "spend_c": batch["spend_c"],
        })

    labeled = j1.map_batches(attach, batch_format="pyarrow",
                             batch_size=None)

    def top3(group: pa.Table) -> pa.Table:
        s = group["spend_c"].to_numpy(zero_copy_only=False)
        ck = group["c_custkey"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ck, -s))[:3]
        sel = pa.array(order)
        rank = np.arange(1, len(order) + 1, dtype=np.int64)
        return pa.table({
            "r_name": group["r_name"].take(sel),
            "c_custkey": group["c_custkey"].take(sel),
            "spend_c": group["spend_c"].take(sel),
            "rank": pa.array(rank),
        })

    return hash_exchange_fine_groups(labeled, ["r_name"], top3)


def _q_brand_share(sf_dir):
    """SHARE-OF-PARENT ratio: each brand's fraction of its part-type's
    retail value (SQL SUM OVER (PARTITION BY) ratio).  One
    combiner-first (type, brand) rollup — the type totals derive from
    the rollup itself on the driver (type vocabulary is
    catalog-bounded), so the parts stream is read ONCE and nothing
    joins back through an exchange."""
    import ray.data

    from engine.rayds.shuffle import grouped_agg

    parts = ray.data.read_parquet(f"{sf_dir}/part.parquet",
                                  columns=["p_type", "p_brand",
                                           "p_retailprice"])

    def cents(batch: pa.Table) -> pa.Table:
        c = np.rint(batch["p_retailprice"].to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)
        return pa.table({"p_type": batch["p_type"],
                         "p_brand": batch["p_brand"],
                         "_c": pa.array(c)})

    proj = parts.map_batches(cents, batch_format="pyarrow",
                             batch_size=None, zero_copy_batch=True)
    agg = grouped_agg(proj, ["p_type", "p_brand"], [("_c", "sum")],
                      ["brand_c"], plan="tree")
    t = pa.concat_tables(
        [b for b in agg.iter_batches(batch_format="pyarrow")])
    types = np.asarray(t["p_type"].to_pylist(), dtype=object)
    bc = t["brand_c"].to_numpy(zero_copy_only=False).astype(np.int64)
    totals = {}
    for ty, c in zip(types, bc):
        totals[ty] = totals.get(ty, 0) + int(c)
    tot = np.array([totals[ty] for ty in types], dtype=np.int64)
    share = bc.astype(np.float64) / tot.astype(np.float64)
    return pa.table({
        "p_type": t["p_type"], "p_brand": t["p_brand"],
        "brand_c": t["brand_c"],
        "type_c": pa.array(tot),
        "share": pa.array(share),
    })


def _q_curation_pipeline(sf_dir):
    """END-TO-END LLM DATA-CURATION CHAIN (the flagship text-pipeline
    composition): language filter (pred_lang = 'en', vectorized marker
    scores) → integer quality gates (5 ≤ tokens ≤ 1000, digit-ratio
    < 20% as the pure-int comparison 5·digits < chars) → exact dedup
    on the vectorized md5(text) 16-hex key keeping the lowest doc_id.
    All predicates are integer comparisons and the dedup key is
    byte-equal with the oracle's substr(md5(text),1,16), so the kept
    set matches hash-exactly.  One map chain + ONE hash exchange on
    the fp key — the text itself never rides a shuffle."""
    import pyarrow.compute as pc

    from engine.ops import text
    from engine.ops.vhash import md5_hex
    from engine.rayds.shuffle import hash_shuffle_agg

    def gate(batch: pa.Table) -> pa.Table:
        t = text.lang_id(batch)
        keep = pc.equal(t["pred_lang"], "en").to_numpy(
            zero_copy_only=False)
        txt = t["text"]
        ntok = pc.add(pc.count_substring(txt, " "), 1).to_numpy(
            zero_copy_only=False)
        ndig = pc.count_substring_regex(txt, "[0-9]").to_numpy(
            zero_copy_only=False)
        nch = pc.utf8_length(txt).to_numpy(zero_copy_only=False)
        keep &= (ntok >= 5) & (ntok <= 1000) & (5 * ndig < nch)
        kept = t.filter(pa.array(keep))
        fp = md5_hex(kept["text"], prefix=16)
        g = pa.table({"fp": pa.array(fp, type=pa.string()),
                      "doc_id": kept["doc_id"],
                      "n_tokens": pa.array(
                          ntok[keep].astype(np.int64))})
        # duplicates share identical text, hence identical n_tokens —
        # min() carries the kept doc's value exactly
        agg = g.group_by(["fp"]).aggregate(
            [("doc_id", "min"), ("n_tokens", "min")])
        return agg.rename_columns(["fp", "_min_id", "_nt"])

    part = _docs(sf_dir).select_columns(["doc_id", "text"]).map_batches(
        gate, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True)
    return hash_shuffle_agg(part, ["fp"],
                            [("_min_id", "min"), ("_nt", "min")],
                            ["doc_id", "n_tokens"])


def _q_user_event_path(sf_dir):
    """Per-key ORDERED STRING AGGREGATION: each user's full event-type
    sequence as one comma-joined string (the clickstream-path feature).
    One hash exchange on user_id; per partition a lexsort then ONE
    vectorized pyarrow binary_join over the key-run ListArray — no
    per-group Python string work."""
    import ray.data

    from engine.ops.window import grouped_string_agg

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type"],
    )

    def project(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch["user_id"],
                "ts_us": batch["ts"].cast(pa.int64()),
                "event_id": batch["event_id"],
                "event_type": batch["event_type"],
            }
        )

    proj = ds.map_batches(project, batch_format="pyarrow", batch_size=None,
                          zero_copy_batch=True)
    return grouped_string_agg(proj, "user_id", ["ts_us", "event_id"],
                              "event_type", sep=",", out_col="path")


def _q_triangle_count(sf_dir):
    """Distributed EXACT TRIANGLE COUNT (graph analytics over the
    node-iterator plan, engine/ops/graph.py::triangle_count): edges
    derived deterministically from event ids onto a 499-vertex domain
    (mirrored bit-for-bit by the SQL oracle's 3-way self-join)."""
    import ray.data

    from engine.ops.graph import triangle_count

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id"]
    )

    def edges(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy()
        # b must NOT be a pure function of (eid mod 499) — a linear map
        # gives a functional graph with zero triangles; mixing eid//499
        # and a second modulus makes the graph genuinely random-ish
        return pa.table(
            {
                "a": pa.array(eid % np.int64(499)),
                "b": pa.array((eid // np.int64(499) + eid % np.int64(491))
                              % np.int64(499)),
            }
        )

    e = ds.map_batches(edges, batch_format="pyarrow", batch_size=None,
                       zero_copy_batch=True)
    return triangle_count(e)


def _q_phash_neardup(sf_dir):
    """IMAGE near-duplicate pairs by perceptual-hash Hamming distance —
    the multimodal arm of the dedup family: lean synth→phash stage
    (no payload bytes anywhere near the exchange), then the generic
    banded-Hamming LSH core (4×16-bit bands ⇒ EXACT recall at
    max_ham=3 by pigeonhole; pinned by the brute-force recall pytest —
    pixel-derived hashes aren't SQL-expressible, so no oracle)."""
    import pyarrow.compute as pc

    from engine.ops.dedup import hash_near_pairs
    from engine.rayds.imgstage import phash_dataset

    hashed = phash_dataset(sf_dir).map_batches(
        lambda t: pa.table({
            "img_num": pc.cast(pc.utf8_slice_codeunits(t["image_id"], 3),
                               pa.int64()),
            "phash": t["phash"],
        }),
        batch_format="pyarrow", batch_size=None,
    )
    return hash_near_pairs(hashed, "img_num", "phash", max_ham=3)


def _q_value_ntile(sf_dir):
    """Per-group NTILE(4) (equal-frequency quartile assignment — the
    feature-bucketing window function): each event's quartile within
    its event_type, ordered by (value, event_id).  One hash exchange on
    the group key; per partition a lexsort + pure integer bucket
    formula (first n%k buckets get ceil(n/k) rows — the SQL NTILE
    contract, exact at any partitioning)."""
    import ray.data

    from engine.ops.window import grouped_ntile

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "event_type", "value"],
    )
    return grouped_ntile(ds, "event_type", ["value", "event_id"], 4,
                         id_col="event_id", out_col="quartile")


def _q_lineitem_rank(sf_dir):
    """RANK / DENSE_RANK / PERCENT_RANK of each line item's quantity
    within its order (the ranking-window-function family,
    engine/ops/window.py::grouped_rank).  High-cardinality partition
    key (l_orderkey), heavy value ties (integral quantities) — rank ≠
    dense_rank ≠ row position.  All three depend only on the value
    ordering, so no tie-breaker is needed and the result is exact at
    any partitioning; percent_rank is ONE fixed division mirrored by
    the SQL window oracle."""
    import ray.data

    from engine.ops.window import grouped_rank

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_quantity"],
    )
    return grouped_rank(ds, "l_orderkey", "l_quantity",
                        ["l_linenumber"])


def _q_fuzzy_title_pairs(sf_dir):
    """FUZZY entity resolution: document-title pairs within edit
    distance 1 (engine/ops/fuzzy.py) — symmetric-delete key blocking
    (EXACT recall for ed<=1: equal strings share the identity key, a
    substitution shares the deletion at that position, an indel shares
    the longer side's deletion), one hash exchange, chunked vectorized
    lcp/lcs verify, pair dedupe by min editdist.  Title = first 24
    chars (ASCII corpus ⇒ byte-ed == DuckDB levenshtein)."""
    import pyarrow.compute as pc
    import ray.data

    from engine.ops.fuzzy import fuzzy_pairs

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(
        lambda t: pa.table({
            "doc_id": t["doc_id"],
            "title": pc.utf8_slice_codeunits(t["text"], 0, 24),
        }),
        batch_format="pyarrow", batch_size=None,
    )
    return fuzzy_pairs(ds, "doc_id", "title")


def _q_pagerank_top20(sf_dir):
    """PAGERANK (engine/ops/graph.py::pagerank): BSP task rounds over a
    static hash partitioning of the node space — 2 waves + P² narrow
    (dst, float) bundles per round, dangling mass uniformly
    redistributed, deterministic fold order so ranks are
    bit-reproducible.  Iterative float fixpoint ⇒ not SQL-expressible;
    pinned instead by the 1e-12 single-process parity pytest.  Top-20
    by (pr desc, node) over the tiny (node, pr) result."""
    import ray.data

    from engine.ops.graph import pagerank

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id"]
    )

    def edges(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy()
        return pa.table({
            "src": pa.array(eid % np.int64(499)),
            "dst": pa.array((eid // np.int64(499) + eid % np.int64(491))
                            % np.int64(499)),
        })

    e = ds.map_batches(edges, batch_format="pyarrow", batch_size=None,
                       zero_copy_batch=True)
    pr = pagerank(e, damping=0.85, iters=20)
    return pr.sort(["pr", "node"], descending=[True, False]).limit(20)


def _q_q4_priority(sf_dir):
    """TPC-H Q4-shaped CORRELATED EXISTS: count orders per priority
    having at least one lineitem shipped after the order date.
    EXISTS(ship > odate) ⟺ per-order max(shipdate) > odate, so the
    lineitem stream collapses to ONE row per orderkey (combiner-first
    grouped max, one exchange) BEFORE the join — the exists probe never
    materializes pair rows.  The join is the adaptive equi-join on
    orderkey (hash plan: both sides scale); the 5-row priority count is
    a combiner-first tree fold."""
    import ray.data

    from engine.rayds.shuffle import equi_join, grouped_agg, grouped_count

    li = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_orderkey", "l_shipdate"])

    def ship_us(batch: pa.Table) -> pa.Table:
        return pa.table({"l_orderkey": batch["l_orderkey"],
                         "_s": batch["l_shipdate"].cast(pa.int64())})

    mx = grouped_agg(
        li.map_batches(ship_us, batch_format="pyarrow", batch_size=None,
                       zero_copy_batch=True),
        ["l_orderkey"], [("_s", "max")], ["max_ship_us"], plan="shuffle")

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"])

    def odate(batch: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": batch["o_orderkey"],
            "o_date_us": batch["o_orderdate"].cast(pa.int64()),
            "o_orderpriority": batch["o_orderpriority"],
        })

    orders = orders.map_batches(odate, batch_format="pyarrow",
                                batch_size=None, zero_copy_batch=True)
    j = equi_join(orders, mx, "o_orderkey", "l_orderkey",
                  ["o_date_us", "o_orderpriority"], ["max_ship_us"])

    def exists(batch: pa.Table) -> pa.Table:
        keep = (batch["max_ship_us"].to_numpy(zero_copy_only=False)
                > batch["o_date_us"].to_numpy(zero_copy_only=False))
        return batch.filter(pa.array(keep)).select(["o_orderpriority"])

    hit = j.map_batches(exists, batch_format="pyarrow", batch_size=None,
                        zero_copy_batch=True)
    return grouped_count(hit, ["o_orderpriority"], out_col="n_orders")


def _q_cust_order_dist(sf_dir):
    """TPC-H Q13-shaped LEFT-OUTER DISTRIBUTION: how many customers
    placed exactly k URGENT orders, INCLUDING the k=0 bucket.  The
    scale plan never left-joins the full customer table: urgent orders
    roll up to per-customer counts (one exchange on o_custkey), the
    k-histogram is a second combiner-first count (k is bounded by a
    customer's order volume, so the histogram is tiny), and the k=0
    bucket is |customer| − |customers with ≥1 urgent order| — the
    customer table contributes only its parquet-metadata row count
    (exact because o_custkey ⊆ c_custkey by construction)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray.data

    from engine.rayds.shuffle import grouped_count

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderpriority"])

    def urgent(batch: pa.Table) -> pa.Table:
        keep = pc.equal(batch["o_orderpriority"], "1-URGENT")
        return batch.filter(keep).select(["o_custkey"])

    u = orders.map_batches(urgent, batch_format="pyarrow",
                           batch_size=None, zero_copy_batch=True)
    per_cust = grouped_count(u, ["o_custkey"], out_col="n_urgent",
                             use_shuffle=True)
    hist = grouped_count(per_cust.select_columns(["n_urgent"]),
                         ["n_urgent"], out_col="n_cust")
    batches = [b for b in hist.iter_batches(batch_format="pyarrow")]
    t = pa.concat_tables(batches) if batches else pa.table({
        "n_urgent": pa.array([], type=pa.int64()),
        "n_cust": pa.array([], type=pa.int64())})
    n_customers = pq.ParquetFile(
        f"{sf_dir}/customer.parquet").metadata.num_rows
    with_urgent = int(pc.sum(t["n_cust"]).as_py() or 0)
    zero = n_customers - with_urgent
    if zero > 0:
        t = pa.concat_tables([t, pa.table({
            "n_urgent": pa.array([0], type=pa.int64()),
            "n_cust": pa.array([zero], type=pa.int64())})])
    return t


def _q_promo_share(sf_dir):
    """TPC-H Q14-shaped CONDITIONAL REVENUE SHARE: fraction of 1996-Q1
    revenue coming from PROMO-type parts.  Lineitem prunes to the date
    window and the 3 needed columns at the read; part contributes only
    (p_partkey, is_promo) through the adaptive equi-join (broadcast
    while the catalog fits, hash past it); the conditional/total
    basis-point sums reduce as per-block 2-int partials through the
    raw-task tree fold — no all-to-all anywhere.  The share is ONE
    float division of exact int64 basis points, mirrored bit-for-bit
    by the SQL oracle."""
    import pyarrow.compute as pc
    import ray.data

    from engine.rayds.shuffle import equi_join, tree_fold_refs

    lo = pa.scalar(np.datetime64("1996-01-01", "us"))
    hi = pa.scalar(np.datetime64("1996-04-01", "us"))
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount",
                 "l_shipdate"])

    def window_bp(batch: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(batch["l_shipdate"], lo),
                    pc.less(batch["l_shipdate"], hi))
        b = batch.filter(m)
        ep = b["l_extendedprice"].to_numpy(zero_copy_only=False)
        dc = b["l_discount"].to_numpy(zero_copy_only=False)
        bp = np.floor(ep * (1.0 - dc) * 10000.0).astype(np.int64)
        return pa.table({"l_partkey": b["l_partkey"],
                         "_bp": pa.array(bp)})

    win = li.map_batches(window_bp, batch_format="pyarrow",
                         batch_size=None, zero_copy_batch=True)
    part = ray.data.read_parquet(f"{sf_dir}/part.parquet",
                                 columns=["p_partkey", "p_type"])

    def promo_flag(batch: pa.Table) -> pa.Table:
        f = pc.equal(batch["p_type"], "PROMO").cast(pa.int64())
        return pa.table({"p_partkey": batch["p_partkey"],
                         "_promo": f})

    part = part.map_batches(promo_flag, batch_format="pyarrow",
                            batch_size=None, zero_copy_batch=True)
    j = equi_join(win, part, "l_partkey", "p_partkey",
                  ["_bp"], ["_promo"])

    def partial(batch: pa.Table) -> pa.Table:
        bp = batch["_bp"].to_numpy(zero_copy_only=False)
        pr = batch["_promo"].to_numpy(zero_copy_only=False)
        return pa.table({
            "promo_bp": pa.array([int((bp * pr).sum())], type=pa.int64()),
            "total_bp": pa.array([int(bp.sum())], type=pa.int64()),
        })

    parts = j.map_batches(partial, batch_format="pyarrow",
                          batch_size=None, zero_copy_batch=True)

    def combine(tbls: list[pa.Table]) -> pa.Table:
        t = pa.concat_tables(tbls)
        return pa.table({
            "promo_bp": pa.array([int(pc.sum(t["promo_bp"]).as_py() or 0)],
                                 type=pa.int64()),
            "total_bp": pa.array([int(pc.sum(t["total_bp"]).as_py() or 0)],
                                 type=pa.int64()),
        })

    t = tree_fold_refs(parts, combine)
    if t.num_columns == 0 or t.num_rows == 0:
        # an empty date window is legitimate on a sparse partition
        t = pa.table({"promo_bp": pa.array([0], type=pa.int64()),
                      "total_bp": pa.array([0], type=pa.int64())})
    promo = t["promo_bp"][0].as_py()
    tot = t["total_bp"][0].as_py()
    return t.append_column(
        "promo_share",
        pa.array([float(promo) / float(tot) if tot else 0.0],
                 type=pa.float64()))


def _q_cust_no_urgent(sf_dir):
    """TPC-H Q22-shaped SCALAR SUBQUERY + ANTI JOIN: per nation, count
    and total balance of customers whose balance exceeds the average
    positive balance and who never placed an URGENT order.  The global
    average stays EXACT-INTEGER: per-block (Σcents, n) partials tree-
    fold to two scalars and the filter is the integer cross-multiply
    bal·n > Σ (no float average anywhere — mirrored by the SQL oracle;
    at 10^12 customers the product needs int128, noted here: numpy
    int64 holds to ~9e18 = 9e12 customers × 1e6-cent balances).  The
    have-urgent set is a distinct-custkey rollup; absence = LEFT OUTER
    adaptive join + null filter; the nation rollup is combiner-first
    (nation-bounded, tree fold)."""
    import pyarrow.compute as pc
    import ray.data

    from engine.rayds.shuffle import (equi_join, grouped_agg,
                                      grouped_count, tree_fold_refs)

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey", "c_acctbal"])

    def cents(batch: pa.Table) -> pa.Table:
        c = np.rint(batch["c_acctbal"].to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)
        return pa.table({"c_custkey": batch["c_custkey"],
                         "c_nationkey": batch["c_nationkey"],
                         "bal_c": pa.array(c)})

    cc = cust.map_batches(cents, batch_format="pyarrow", batch_size=None,
                          zero_copy_batch=True)

    def pos_partial(batch: pa.Table) -> pa.Table:
        b = batch["bal_c"].to_numpy(zero_copy_only=False)
        b = b[b > 0]
        return pa.table({"_s": pa.array([int(b.sum())], type=pa.int64()),
                         "_n": pa.array([len(b)], type=pa.int64())})

    def fold(tbls: list[pa.Table]) -> pa.Table:
        t = pa.concat_tables(tbls)
        return pa.table({
            "_s": pa.array([int(pc.sum(t["_s"]).as_py() or 0)],
                           type=pa.int64()),
            "_n": pa.array([int(pc.sum(t["_n"]).as_py() or 0)],
                           type=pa.int64())})

    # scale-invariant scalar: two ints to the driver through the fold
    s = tree_fold_refs(
        cc.map_batches(pos_partial, batch_format="pyarrow",
                       batch_size=None, zero_copy_batch=True), fold)
    tot, n_pos = s["_s"][0].as_py(), s["_n"][0].as_py()

    def rich(batch: pa.Table) -> pa.Table:
        b = batch["bal_c"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(b * n_pos > tot))

    rich_ds = cc.map_batches(rich, batch_format="pyarrow",
                             batch_size=None, zero_copy_batch=True)

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderpriority"])

    def urgent(batch: pa.Table) -> pa.Table:
        keep = pc.equal(batch["o_orderpriority"], "1-URGENT")
        return batch.filter(keep).select(["o_custkey"])

    has_urgent = grouped_count(
        orders.map_batches(urgent, batch_format="pyarrow",
                           batch_size=None, zero_copy_batch=True),
        ["o_custkey"], out_col="_hit", use_shuffle=True)
    j = equi_join(rich_ds, has_urgent, "c_custkey", "o_custkey",
                  ["c_nationkey", "bal_c"], ["_hit"],
                  join_type="left outer")

    def no_hit(batch: pa.Table) -> pa.Table:
        keep = pc.is_null(batch["_hit"])
        return batch.filter(keep).select(["c_nationkey", "bal_c"])

    anti = j.map_batches(no_hit, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True)

    def one(batch: pa.Table) -> pa.Table:
        return batch.append_column("_one", pa.array(
            np.ones(batch.num_rows, dtype=np.int64)))

    return grouped_agg(
        anti.map_batches(one, batch_format="pyarrow", batch_size=None),
        ["c_nationkey"], [("_one", "sum"), ("bal_c", "sum")],
        ["n_cust", "total_bal_c"], plan="tree")


def _q_users_both_halves(sf_dir):
    """ROW-SET INTERSECT: user_ids active in BOTH halves of the month.
    One combiner-first grouped min/max over a 0/1 half flag —
    present-in-both ⟺ min=0 ∧ max=1 — so the INTERSECT costs one
    exchange on the key and never materializes either distinct set
    (the general plan for INTERSECT/EXCEPT over distinct keys: reduce
    per-key presence masks, filter the mask)."""
    import ray.data

    from engine.rayds.shuffle import grouped_agg

    mid = np.datetime64("2024-01-16T00:00:00", "us").astype(np.int64)
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts"])

    def flag(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({"user_id": batch["user_id"],
                         "half": pa.array((ts >= mid).astype(np.int64))})

    proj = ds.map_batches(flag, batch_format="pyarrow", batch_size=None,
                          zero_copy_batch=True)
    agg = grouped_agg(proj, ["user_id"],
                      [("half", "min"), ("half", "max")],
                      ["h_min", "h_max"], plan="shuffle")

    def both(batch: pa.Table) -> pa.Table:
        lo = batch["h_min"].to_numpy(zero_copy_only=False)
        hi = batch["h_max"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array((lo == 0) & (hi == 1))).select(
            ["user_id"])

    return agg.map_batches(both, batch_format="pyarrow", batch_size=None,
                           zero_copy_batch=True)


def _q_session_quantiles(sf_dir):
    """PIPELINE COMPOSITION sessionize → exact quantiles: p50/p90 of
    session DURATION (µs, 30-min gap).  Sessions form in one hash
    exchange on user_id (vectorized per-partition lexsort + gap-diff,
    emitting one int64 duration per session); the quantiles ride the
    shared histogram-refinement waves (engine/ops/kth.py) — EXACT and
    bit-identical to SQL quantile_cont (integer value universe, lerp in
    DuckDB's own expression order)."""
    import ray.data

    from engine.ops.kth import quantiles_cont
    from engine.rayds.shuffle import hash_exchange_groups

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts"])
    gap_us = 1_800_000_000

    def part_fn(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_part"])
        k = g["user_id"].to_numpy()
        ts = g["ts"].cast(pa.int64()).to_numpy()
        order = np.lexsort((ts, k))
        k, ts = k[order], ts[order]
        n = len(k)
        if n == 0:
            return pa.table({"dur_us": pa.array([], type=pa.int64())})
        new_s = np.ones(n, dtype=bool)
        new_s[1:] = (k[1:] != k[:-1]) | ((ts[1:] - ts[:-1]) > gap_us)
        starts = np.nonzero(new_s)[0]
        ends = np.append(starts[1:], n) - 1
        return pa.table({"dur_us": pa.array(
            (ts[ends] - ts[starts]).astype(np.int64))})

    sess = hash_exchange_groups(ds, ["user_id"], part_fn).materialize()
    n_sessions = sess.count()
    p50, p90 = quantiles_cont(sess, "dur_us", [0.5, 0.9])
    return pa.table({
        "n_sessions": pa.array([n_sessions], type=pa.int64()),
        "p50_dur": pa.array([p50], type=pa.float64()),
        "p90_dur": pa.array([p90], type=pa.float64()),
    })


def _q_bfs_hops4(sf_dir):
    """FIXED-DEPTH DISTRIBUTED BFS (min hop count ≤ 4 from node 0) over
    the events-derived undirected graph — the Spark-style K-chained
    frontier plan: each round joins ONLY the newest frontier against
    the edge table through the adaptive equi-join, unions into the
    label set and re-minimizes (combiner-first grouped min, one
    exchange on node).  Frontier volume is bounded by reachable-set
    growth, edges stream per round, nothing lands on the driver.  For
    unbounded-depth traversal the CC/PageRank BSP task rounds
    (engine/ops/graph.py) are the scale path; fixed K keeps this one
    SQL-expressible (K chained DISTINCT joins in the oracle)."""
    import ray.data

    from engine.rayds.shuffle import equi_join, grouped_agg, grouped_count

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id"])

    def edges(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy()
        x = eid % np.int64(499)
        y = (eid // np.int64(499) + eid % np.int64(491)) % np.int64(499)
        m = x != y
        x, y = x[m], y[m]
        return pa.table({
            "a": pa.array(np.concatenate([x, y])),
            "b": pa.array(np.concatenate([y, x])),
        })

    e = grouped_count(
        ds.map_batches(edges, batch_format="pyarrow", batch_size=None,
                       zero_copy_batch=True),
        ["a", "b"], out_col="_d", use_shuffle=True,
    ).select_columns(["a", "b"]).materialize()

    labels = ray.data.from_arrow(pa.table({
        "node": pa.array([0], type=pa.int64()),
        "hops": pa.array([0], type=pa.int64())}))
    frontier = labels
    for k in range(1, 5):
        nxt = equi_join(frontier, e, "node", "a", [], ["b"])
        reached = nxt.map_batches(
            lambda t, k=k: pa.table({
                "node": t["b"],
                "hops": pa.array(np.full(t.num_rows, k, dtype=np.int64)),
            }),
            batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
        # adaptive min-merge: while the label set is small the tree
        # fold skips the 64-part exchange's fixed cost; past the budget
        # the hash shuffle is the scale plan (node cardinality grows
        # with the graph).  labels is materialized ⇒ count() is free.
        plan = "tree" if labels.count() < 100_000 else "shuffle"
        labels = grouped_agg(labels.union(reached), ["node"],
                             [("hops", "min")], ["hops"],
                             plan=plan).materialize()
        frontier = labels.filter(
            lambda r, k=k: r["hops"] == k).materialize()
        if frontier.count() == 0:  # exhausted before depth K
            break
    return labels


def _q_user_active_time(sf_dir):
    """INTERVAL UNION LENGTH per key (total 'active time'): each event
    opens a fixed 15-minute presence interval; overlapping intervals
    merge and the merged lengths sum per user.  Fixed-length intervals
    sorted by start have nondecreasing ends, so the merge break is the
    single vectorized compare s[i] > s[i−1]+L — ONE hash exchange on
    user_id, per-partition lexsort + reduceat, no segmented cummax
    needed (the variable-length form would composite-shift a run-local
    cummax).  Mirrored by the SQL lag/island oracle."""
    import ray.data

    from engine.rayds.shuffle import hash_exchange_groups

    L = 900_000_000
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts"])

    def part_fn(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_part"])
        u = g["user_id"].to_numpy()
        s = g["ts"].cast(pa.int64()).to_numpy()
        order = np.lexsort((s, u))
        u, s = u[order], s[order]
        n = len(u)
        if n == 0:
            return pa.table({"user_id": pa.array([], type=pa.int64()),
                             "active_us": pa.array([], type=pa.int64())})
        brk = np.ones(n, dtype=bool)
        brk[1:] = (u[1:] != u[:-1]) | (s[1:] > s[:-1] + L)
        starts = np.nonzero(brk)[0]
        ends = np.append(starts[1:], n) - 1
        mlen = (s[ends] + L) - s[starts]
        mu = u[starts]
        ustart = np.ones(len(mu), dtype=bool)
        ustart[1:] = mu[1:] != mu[:-1]
        uidx = np.nonzero(ustart)[0]
        return pa.table({
            "user_id": pa.array(mu[uidx]),
            "active_us": pa.array(
                np.add.reduceat(mlen, uidx).astype(np.int64)),
        })

    return hash_exchange_groups(ds, ["user_id"], part_fn)


def _q_click_nobuy_days(sf_dir):
    """ROW-SET EXCEPT over a composite key: (user, day) pairs with ≥1
    click but NO purchase that day — the complement family to
    users_both_halves' INTERSECT, same one-exchange plan: reduce per-key
    presence flags (max of a 0/1 per event class), filter the mask.
    Neither distinct side ever materializes."""
    import pyarrow.compute as pc
    import ray.data

    from engine.rayds.shuffle import grouped_agg

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_type"])

    def flags(batch: pa.Table) -> pa.Table:
        et = batch["event_type"]
        keep = pc.or_(pc.equal(et, "click"), pc.equal(et, "purchase"))
        b = batch.filter(keep)
        day = (b["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
               // 86_400_000_000)
        is_buy = pc.equal(b["event_type"], "purchase").to_numpy(
            zero_copy_only=False).astype(np.int64)
        return pa.table({
            "user_id": b["user_id"],
            "day": pa.array(day.astype(np.int64)),
            "c": pa.array(1 - is_buy),
            "p": pa.array(is_buy),
        })

    proj = ds.map_batches(flags, batch_format="pyarrow", batch_size=None,
                          zero_copy_batch=True)
    agg = grouped_agg(proj, ["user_id", "day"],
                      [("c", "max"), ("p", "max")], ["has_c", "has_p"],
                      plan="shuffle")

    def except_fn(batch: pa.Table) -> pa.Table:
        c = batch["has_c"].to_numpy(zero_copy_only=False)
        p = batch["has_p"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array((c == 1) & (p == 0))).select(
            ["user_id", "day"])

    return agg.map_batches(except_fn, batch_format="pyarrow",
                           batch_size=None, zero_copy_batch=True)


def _q_distinct_users_hll(sf_dir):
    """APPROXIMATE COUNT DISTINCT (HyperLogLog, p=14): per-block 16 KiB
    register partials merge by elementwise max through the tree fold —
    ZERO exchanges, constant driver traffic; the scale path when exact
    distinct (distinct_users ★) is too wide.  Hash-derived ⇒ no SQL
    oracle; the ±2% bound vs the exact count is pinned by pytest and
    asserted here."""
    import ray.data

    from engine.ops.sketch import hll_distinct
    from engine.rayds.shuffle import tree_fold_refs  # noqa: F401 (doc)

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id"])
    est = hll_distinct(ds, "user_id")
    return pa.table({"n_users_hll": pa.array([est], type=pa.float64())})


def _q_calendar_fill(sf_dir):
    """TIME-SERIES GAP FILL: dense daily counts of high-value events
    (value > 300) INCLUDING zero days, over the calendar spanned by the
    whole stream.  The calendar bounds come from per-block (min, max)
    day partials (2 ints through the tree fold); the spine is
    calendar-bounded — days, not data — so it generates driver-side at
    any input volume; sparse counts are combiner-first and join the
    spine in one vectorized map.  The standard dense-feature op (LEFT
    JOIN generate_series in SQL)."""
    import pyarrow.compute as pc
    import ray.data

    from engine.rayds.shuffle import grouped_count, tree_fold_refs

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "value"])

    def day_partial(batch: pa.Table) -> pa.Table:
        day = (batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
               // 86_400_000_000)
        if len(day) == 0:
            return pa.table({"_lo": pa.array([], type=pa.int64()),
                             "_hi": pa.array([], type=pa.int64())})
        return pa.table({"_lo": pa.array([int(day.min())], type=pa.int64()),
                         "_hi": pa.array([int(day.max())], type=pa.int64())})

    def fold(tbls: list[pa.Table]) -> pa.Table:
        t = pa.concat_tables(tbls)
        return pa.table({
            "_lo": pa.array([pc.min(t["_lo"]).as_py()], type=pa.int64()),
            "_hi": pa.array([pc.max(t["_hi"]).as_py()], type=pa.int64())})

    b = tree_fold_refs(
        ds.map_batches(day_partial, batch_format="pyarrow",
                       batch_size=None, zero_copy_batch=True), fold)
    lo, hi = b["_lo"][0].as_py(), b["_hi"][0].as_py()

    def rare_day(batch: pa.Table) -> pa.Table:
        keep = pc.greater(batch["value"], 300.0)
        f = batch.filter(keep)
        day = (f["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
               // 86_400_000_000)
        return pa.table({"day": pa.array(day.astype(np.int64))})

    counts = grouped_count(
        ds.map_batches(rare_day, batch_format="pyarrow", batch_size=None,
                       zero_copy_batch=True), ["day"], out_col="n")
    cb = [bb for bb in counts.iter_batches(batch_format="pyarrow")]
    t = pa.concat_tables(cb) if cb else pa.table({
        "day": pa.array([], type=pa.int64()),
        "n": pa.array([], type=pa.int64())})
    spine = np.arange(lo, hi + 1, dtype=np.int64)
    dense = np.zeros(len(spine), dtype=np.int64)
    if t.num_rows:
        d = t["day"].to_numpy(zero_copy_only=False)
        n = t["n"].to_numpy(zero_copy_only=False)
        dense[d - lo] = n
    return pa.table({"day": pa.array(spine),
                     "n_events": pa.array(dense)})


def _q_locf_value(sf_dir):
    """LAST-OBSERVATION-CARRIED-FORWARD imputation per key (the
    canonical time-series data-prep op): error events' values are
    treated as missing and filled from the user's most recent non-error
    value (−1 when none yet).  ONE hash exchange on user_id;
    per-partition everything is vectorized — lexsort by (user, ts,
    event_id), np.maximum.accumulate over valid source positions, a
    run-start compare gates carries from crossing key boundaries.
    Mirrored by the SQL last_value(... IGNORE NULLS) window oracle."""
    import pyarrow.compute as pc
    import ray.data

    from engine.rayds.shuffle import hash_exchange_groups

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type", "value"])

    def part_fn(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_part"])
        u = g["user_id"].to_numpy()
        ts = g["ts"].cast(pa.int64()).to_numpy()
        eid = g["event_id"].to_numpy()
        val = g["value"].to_numpy(zero_copy_only=False)
        valid = (pc.not_equal(g["event_type"], "error")
                 .to_numpy(zero_copy_only=False))
        order = np.lexsort((eid, ts, u))
        u, eid, val, valid = u[order], eid[order], val[order], valid[order]
        n = len(u)
        if n == 0:
            return pa.table({
                "event_id": pa.array([], type=pa.int64()),
                "user_id": pa.array([], type=pa.int64()),
                "filled_value": pa.array([], type=pa.float64())})
        pos = np.arange(n, dtype=np.int64)
        src = np.where(valid, pos, np.int64(-1))
        carry = np.maximum.accumulate(src)
        run_start = np.zeros(n, dtype=bool)
        run_start[0] = True
        run_start[1:] = u[1:] != u[:-1]
        start_pos = pos[run_start][np.cumsum(run_start) - 1]
        ok = carry >= start_pos
        filled = np.where(ok, val[np.maximum(carry, 0)], -1.0)
        return pa.table({
            "event_id": pa.array(eid),
            "user_id": pa.array(u),
            "filled_value": pa.array(filled.astype(np.float64))})

    return hash_exchange_groups(ds, ["user_id"], part_fn)


def _q_csv_roundtrip(sf_dir):
    """CSV SOURCE/SINK roundtrip: an integer projection of lineitem
    writes to CSV (Ray's native partitioned write_csv) and reads back
    through read_csv into the usual combiner-first rollup — the oracle
    aggregates the original table, so the check is lossless-roundtrip +
    aggregation.  Integer columns keep the text roundtrip exact (float
    formatting never enters).  Output layout under /tmp is per-run
    scratch (at scale: one file per block = the resumable layout)."""
    import shutil

    import ray.data

    from engine.rayds.shuffle import grouped_agg

    import hashlib

    # stable scratch path (Python's str hash is process-salted)
    out = ("/tmp/graft_csv_roundtrip_"
           + hashlib.md5(sf_dir.encode()).hexdigest()[:12])
    shutil.rmtree(out, ignore_errors=True)
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity"])

    def ints(batch: pa.Table) -> pa.Table:
        q = np.rint(batch["l_quantity"].to_numpy(
            zero_copy_only=False)).astype(np.int64)
        return pa.table({"l_returnflag": batch["l_returnflag"],
                         "qty": pa.array(q)})

    li.map_batches(ints, batch_format="pyarrow", batch_size=None,
                   zero_copy_batch=True).write_csv(out)
    back = ray.data.read_csv(out)
    return grouped_agg(back, ["l_returnflag"], [("qty", "sum")],
                       ["sum_qty"], plan="tree")


def _q_train_val_split(sf_dir):
    """DETERMINISTIC TRAIN/VAL/TEST SPLIT (the canonical ML-data op):
    each document lands in a split by its md5(doc_id) first byte —
    hex < 'cc' → train (204/256), < 'e6' → val (26/256), else test —
    reproducible on any cluster size or partitioning (pure function of
    the key, the same property as mix_sources).  Vectorized MD5 over
    the Arrow buffer; per-split row and char counts are combiner-first
    partials through the tree fold (3 output rows)."""
    import pyarrow.compute as pc

    from engine.ops.vhash import md5_hex
    from engine.rayds.shuffle import grouped_agg

    docs = _docs(sf_dir).select_columns(["doc_id", "n_chars"])

    def split(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch["doc_id"], pa.string())
        h2 = md5_hex(ids, prefix=2)
        h = np.asarray(h2, dtype=object)
        split = np.where(h < "cc", "train",
                         np.where(h < "e6", "val", "test"))
        return pa.table({
            "split": pa.array(split.astype(object), type=pa.string()),
            "n_chars": batch["n_chars"],
            "_one": pa.array(np.ones(batch.num_rows, dtype=np.int64))})

    proj = docs.map_batches(split, batch_format="pyarrow",
                            batch_size=None, zero_copy_batch=True)
    return grouped_agg(proj, ["split"],
                       [("_one", "sum"), ("n_chars", "sum")],
                       ["n_docs", "total_chars"], plan="tree")


def _q_open_orders_daily(sf_dir):
    """SWEEP-LINE INTERVAL COUNTING: how many orders are 'open' each
    calendar day, treating an order as open for 30 days from its order
    date.  The classic difference-array plan: each order contributes
    (+1 at start_day, −1 at end_day+1) — TWO narrow delta rows per
    order, combiner-first summed per day (one tiny exchange-free tree
    fold: the delta table is calendar-bounded, ≤ 2·days distinct
    rows) — then one driver-side prefix sum over the calendar spine.
    Never materializes the order×day pairs the naive BETWEEN join
    makes (30× the order count)."""
    import ray.data

    from engine.rayds.shuffle import grouped_agg

    ds = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                               columns=["o_orderdate"])

    def deltas(batch: pa.Table) -> pa.Table:
        day = (batch["o_orderdate"].cast(pa.int64())
               .to_numpy(zero_copy_only=False) // 86_400_000_000)
        return pa.table({
            "day": pa.array(np.concatenate([day, day + 30]).astype(
                np.int64)),
            "d": pa.array(np.concatenate([
                np.ones(len(day), dtype=np.int64),
                np.full(len(day), -1, dtype=np.int64)])),
        })

    agg = grouped_agg(
        ds.map_batches(deltas, batch_format="pyarrow", batch_size=None,
                       zero_copy_batch=True),
        ["day"], [("d", "sum")], ["delta"], plan="tree")
    t = pa.concat_tables(
        [b for b in agg.iter_batches(batch_format="pyarrow")])
    d = t["day"].to_numpy(zero_copy_only=False)
    v = t["delta"].to_numpy(zero_copy_only=False)
    order = np.argsort(d, kind="stable")
    d, v = d[order], v[order]
    lo, hi = int(d[0]), int(d[-1])
    dense = np.zeros(hi - lo + 1, dtype=np.int64)
    np.add.at(dense, d - lo, v)
    run = np.cumsum(dense)
    # the final spine day (hi) is the day after the last close: count 0
    return pa.table({"day": pa.array(np.arange(lo, hi, dtype=np.int64)),
                     "n_open": pa.array(run[:hi - lo])})


def _q_feature_hash_counts(sf_dir):
    """FEATURE HASHING (the hashing-trick featurizer): every token of
    every document maps to one of 256 buckets by its md5 first byte;
    per-bucket occurrence counts are the feature vector.  The split
    rides the Arrow ListArray (offset arithmetic), the hash is the
    vectorized MD5 over the flat token buffer, counts are
    combiner-first into a 256-row tree fold — zero all-to-alls at any
    corpus size (bucket space is fixed by construction)."""
    import pyarrow.compute as pc

    from engine.ops.vhash import md5_hex
    from engine.rayds.shuffle import grouped_agg

    docs = _docs(sf_dir).select_columns(["text"])

    def buckets(batch: pa.Table) -> pa.Table:
        words = pc.split_pattern(batch["text"], " ")
        flat = pc.list_flatten(words)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        if len(flat) == 0:
            return pa.table({"bucket": pa.array([], type=pa.string()),
                             "_one": pa.array([], type=pa.int64())})
        h2 = md5_hex(flat, prefix=2)
        return pa.table({
            "bucket": pa.array(h2, type=pa.string()),
            "_one": pa.array(np.ones(len(flat), dtype=np.int64))})

    proj = docs.map_batches(buckets, batch_format="pyarrow",
                            batch_size=None, zero_copy_batch=True)
    return grouped_agg(proj, ["bucket"], [("_one", "sum")], ["n_tokens"],
                       plan="tree")


def _q_ann_range(sf_dir):
    """COSINE RANGE SEARCH (the threshold variant of ANN top-k): all
    (query, vector) pairs with round(cos, 6) ≥ 0.3 for a broadcast
    8-query matrix.  Pure streaming map — each batch computes one
    matmul against the broadcast unit queries and emits its qualifying
    pairs; no exchange, no state.  Same round-6 boundary contract the
    exact embed joins use (proven hash-exact vs DuckDB
    list_cosine_similarity in embed_dedup)."""
    from engine.ops.dedup import _emb_matrix

    q, qids = _load_query_vecs(sf_dir, 8)
    qn = np.linalg.norm(q, axis=1)
    qn[qn == 0] = 1.0
    qunit = (q / qn[:, None]).T  # dim × nq

    def scan(batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy()
        emb = _emb_matrix(batch["embedding"])
        norms = np.linalg.norm(emb, axis=1)
        norms[norms == 0] = 1.0
        sims = (emb / norms[:, None]) @ qunit  # rows × nq
        vi, qi = np.nonzero(np.round(sims, 6) >= 0.3)
        vid, qid = ids[vi], qids[qi]
        keep = vid != qid
        return pa.table({"qid": pa.array(qid[keep]),
                         "vec_id": pa.array(vid[keep])})

    return _embeddings(sf_dir).map_batches(
        scan, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True)


def _q_nearest_poly(sf_dir):
    """DISTRIBUTED STRtree.query_nearest ANALOG: for every image point,
    the nearest polygon (clamp point-to-box distance) with deterministic
    lowest-poly_id tie-break — the engine's documented deviation from
    the reference's explicitly nondeterministic visit-order ties
    (reference strtree.py:276-279).  The layer broadcasts once
    (ray.put); each batch computes the full rows×P distance matrix in
    ONE vectorized expression evaluated in the SQL oracle's exact IEEE
    order, so the returned d2 doubles are bit-identical.  Layer sorted
    by poly_id ⇒ np.argmin's first-min IS the lowest-id tie-break."""
    import ray

    from engine.rayds.imagetab import image_dataset, load_layer

    layer = load_layer(sf_dir)
    order = np.argsort(layer.poly_ids, kind="stable")
    ref = ray.put((layer.poly_ids[order].astype(np.int64),
                   layer.bounds[order]))

    def nearest(batch: pa.Table) -> pa.Table:
        ids, bounds = _bcast_layer(ref)
        x = batch["x"].to_numpy(zero_copy_only=False)
        y = batch["y"].to_numpy(zero_copy_only=False)
        xmin, ymin, xmax, ymax = (bounds[:, 0], bounds[:, 1],
                                  bounds[:, 2], bounds[:, 3])
        dx = np.maximum(np.maximum(xmin[None, :] - x[:, None],
                                   x[:, None] - xmax[None, :]), 0.0)
        dy = np.maximum(np.maximum(ymin[None, :] - y[:, None],
                                   y[:, None] - ymax[None, :]), 0.0)
        d2 = dx * dx + dy * dy
        j = np.argmin(d2, axis=1)
        rows = np.arange(len(x))
        return pa.table({
            "image_id": batch["image_id"],
            "poly_id": pa.array(ids[j]),
            "d2": pa.array(d2[rows, j]),
        })

    return image_dataset(sf_dir).map_batches(
        nearest, batch_format="pyarrow", batch_size=8192,
        zero_copy_batch=True)


def _bcast_layer(ref):
    from engine.rayds.bcast import cached

    return cached(ref)


def _q_grouped_value_sketch(sf_dir):
    """PER-GROUP APPROXIMATE QUANTILES (MRL sketch) — the certified
    scale path grouped_quantiles_cont documents for continuous domains:
    per-block per-group sketch partials (k·levels tiny rows), ONE
    exchange on the group key, per-group merge+query.  Hash/compaction-
    derived values ⇒ no SQL oracle; the ±err rank bound is
    self-certified and pinned by pytest (and spot-asserted here against
    the exact per-group quantile machinery)."""
    import ray.data

    from engine.ops.sketch import grouped_mrl_quantiles

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "value"])
    return grouped_mrl_quantiles(ds, "event_type", "value", [0.5, 0.9])


def _q_quality_buckets(sf_dir):
    """CURRICULUM / QUALITY BINNING (the training-data-mixing op):
    assign every document to one of 4 length-quartile buckets and count
    per (lang, bucket).  The quartile boundaries are EXACT global
    quantile_disc values from the shared histogram-refinement waves
    (engine/ops/kth.py — one histogram pass resolves all three ranks,
    driver traffic = 512 KiB folds); boundaries broadcast into a pure
    streaming bucket-assign map; counts are combiner-first.  Nothing
    wide moves: the only exchange is the (lang, bucket) count merge
    over ≤ 20 distinct keys."""
    import ray.data

    from engine.ops.kth import quantiles_disc
    from engine.rayds.shuffle import grouped_agg

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["lang", "n_chars"])
    dv = ds.map_batches(
        lambda t: pa.table({"v": t["n_chars"].cast(pa.float64())}),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    b25, b50, b75 = quantiles_disc(dv, "v", [0.25, 0.5, 0.75])

    def assign(t: pa.Table) -> pa.Table:
        v = t["n_chars"].to_numpy().astype(np.float64)
        bucket = ((v > b25).astype(np.int64) + (v > b50) + (v > b75))
        return pa.table({"lang": t["lang"],
                         "bucket": pa.array(bucket.astype(np.int64)),
                         "_one": pa.array(np.ones(len(v), dtype=np.int64))})

    g = grouped_agg(
        ds.map_batches(assign, batch_format="pyarrow", batch_size=None,
                       zero_copy_batch=True),
        ["lang", "bucket"], [("_one", "sum")], ["n_docs"], plan="tree")
    return g


def _q_part_best_supplier(sf_dir):
    """ARGMIN JOIN (TPC-H Q2's min-per-group join-back shape): for every
    part, the supplier offering its cheapest lineitem — tie-break lowest
    suppkey.  The (price, suppkey) pair-min is associative, so a
    per-block combiner (lexsort + first-of-run) shrinks every block to
    ≤ distinct-parts rows BEFORE the one hash exchange on partkey; the
    winning suppkeys then take the adaptive equi-join to the supplier
    dimension (broadcast at this cardinality).  Output one row per part
    present in lineitem."""
    import ray.data

    from engine.rayds.shuffle import dim_table, equi_join, \
        hash_exchange_groups

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_suppkey"])

    def block_min(t: pa.Table) -> pa.Table:
        p = t["l_partkey"].to_numpy()
        pr = t["l_extendedprice"].to_numpy()
        s = t["l_suppkey"].to_numpy()
        order = np.lexsort((s, pr, p))
        p, pr, s = p[order], pr[order], s[order]
        first = np.ones(len(p), dtype=bool)
        first[1:] = p[1:] != p[:-1]
        return pa.table({"l_partkey": pa.array(p[first]),
                         "best_price": pa.array(pr[first]),
                         "best_supp": pa.array(s[first])})

    part = li.map_batches(block_min, batch_format="pyarrow",
                          batch_size=None, zero_copy_batch=True)

    def merge(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_part"])
        if g.num_rows == 0:
            return g
        p = g["l_partkey"].to_numpy()
        pr = g["best_price"].to_numpy()
        s = g["best_supp"].to_numpy()
        order = np.lexsort((s, pr, p))
        p, pr, s = p[order], pr[order], s[order]
        first = np.ones(len(p), dtype=bool)
        first[1:] = p[1:] != p[:-1]
        return pa.table({"l_partkey": pa.array(p[first]),
                         "best_price": pa.array(pr[first]),
                         "best_supp": pa.array(s[first])})

    best = hash_exchange_groups(part, ["l_partkey"], merge)
    supp = dim_table(f"{sf_dir}/supplier.parquet", ["s_suppkey", "s_name"])
    j = equi_join(best, supp, "best_supp", "s_suppkey",
                  ["l_partkey", "best_price"], ["s_name"])
    return j.select_columns(["l_partkey", "best_price", "s_name"])


def _q_bottom_decile(sf_dir):
    """BOTTOM-DECILE STATS PER GROUP (the cume_dist ≤ 0.1 window filter)
    computed WITHOUT a window: a row is in the decile iff
    10·rank_le(value) ≤ n, i.e. iff its cents value ≤ the largest
    threshold t with 10·cum(t) ≤ n — so kept-count and kept-sum both
    fall out of the (event_type, cents) COUNT table: combiner-first
    partials (movement bounded by the DISCRETIZED value domain, not
    rows), ONE exchange on event_type, per-partition cumsum.  The
    all-integer predicate sidesteps cume_dist's float division; the SQL
    oracle mirrors it with an integer window count."""
    import ray.data

    from engine.rayds.shuffle import grouped_agg, hash_exchange_groups

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "value"])

    def cents_fn(t: pa.Table) -> pa.Table:
        c = np.floor(t["value"].to_numpy() * 100.0).astype(np.int64)
        return pa.table({"event_type": t["event_type"],
                         "cents": pa.array(c),
                         "_one": pa.array(np.ones(len(c), dtype=np.int64))})

    counts = grouped_agg(
        ds.map_batches(cents_fn, batch_format="pyarrow", batch_size=None,
                       zero_copy_batch=True),
        ["event_type", "cents"], [("_one", "sum")], ["cnt"])

    def decile(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_part"])
        if g.num_rows == 0:
            return pa.table({"event_type": pa.array([], type=pa.string()),
                             "n_decile": pa.array([], type=pa.int64()),
                             "sum_cents": pa.array([], type=pa.int64())})
        et = g["event_type"].to_numpy(zero_copy_only=False)
        c = g["cents"].to_numpy()
        n = g["cnt"].to_numpy()
        order = np.lexsort((c, et))
        et, c, n = et[order], c[order], n[order]
        new = np.ones(len(et), dtype=bool)
        new[1:] = et[1:] != et[:-1]
        gid = np.cumsum(new) - 1
        total = np.bincount(gid, weights=n).astype(np.int64)
        cum = np.cumsum(n)
        starts = np.nonzero(new)[0]
        base_per_group = np.where(starts > 0, cum[starts - 1], 0)
        cum_in = cum - base_per_group[gid]  # rank_le within the group
        keep = 10 * cum_in <= total[gid]
        n_dec = np.bincount(gid[keep], weights=n[keep],
                            minlength=len(total)).astype(np.int64)
        s_dec = np.bincount(gid[keep], weights=n[keep] * c[keep],
                            minlength=len(total)).astype(np.int64)
        return pa.table({
            "event_type": pa.array(et[starts]),
            "n_decile": pa.array(n_dec),
            "sum_cents": pa.array(s_dec)})

    return hash_exchange_groups(counts, ["event_type"], decile)


def _q_sssp_min_cost(sf_dir):
    """WEIGHTED SHORTEST PATH ≤ 3 HOPS (distributed Bellman-Ford,
    fixed depth) from node 0 over the events-derived weighted graph:
    per-round frontier ⋈ edges (adaptive equi-join) + min-plus
    relaxation through the combiner-first grouped min — the bfs_hops4
    plan with integer edge weights.  Multigraph edges collapse to their
    min weight FIRST (one grouped min), so round joins move the simple
    graph only.  Fixed K keeps the oracle SQL-expressible (K chained
    CTE relaxations); unbounded depth belongs to the BSP task rounds
    (engine/ops/graph.py)."""
    import ray.data

    from engine.rayds.shuffle import equi_join, grouped_agg

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id"])

    def edges(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy()
        x = eid % np.int64(499)
        y = (eid // np.int64(499) + eid % np.int64(491)) % np.int64(499)
        w = (eid % np.int64(97)) + np.int64(1)
        m = x != y
        x, y, w = x[m], y[m], w[m]
        return pa.table({
            "a": pa.array(np.concatenate([x, y])),
            "b": pa.array(np.concatenate([y, x])),
            "w": pa.array(np.concatenate([w, w])),
        })

    e = grouped_agg(
        ds.map_batches(edges, batch_format="pyarrow", batch_size=None,
                       zero_copy_batch=True),
        ["a", "b"], [("w", "min")], ["w"]).materialize()

    dist = ray.data.from_arrow(pa.table({
        "node": pa.array([0], type=pa.int64()),
        "cost": pa.array([0], type=pa.int64())}))
    for _ in range(3):
        relax = equi_join(dist, e, "node", "a", ["cost"], ["b", "w"])
        cand = relax.map_batches(
            lambda t: pa.table({
                "node": t["b"],
                "cost": pa.array(t["cost"].to_numpy()
                                 + t["w"].to_numpy())}),
            batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
        plan = "tree" if dist.count() < 100_000 else "shuffle"
        dist = grouped_agg(dist.union(cand), ["node"],
                           [("cost", "min")], ["cost"],
                           plan=plan).materialize()
    return dist


def _q_morans_i(sf_dir):
    """MORAN'S I SPATIAL AUTOCORRELATION of the image-point density
    field over the planar 5×5 grid (rook adjacency between occupied
    cells) — the classic hotspot/clustering statistic.  Per-cell counts
    are combiner-first (movement = occupied cells × blocks); the final
    quadratic form runs driver-side over the LATTICE-BOUNDED cell table
    (≤ 400 cells here; bounded by world/cell_size², never by rows) in
    exact python-int arithmetic — deviations are scaled integers
    a_i = N·n_i − S so no float enters until the one final expression,
    mirrored term-for-term by the SQL oracle."""
    import ray.data

    from engine.rayds import imagetab
    from engine.rayds.shuffle import grouped_agg

    ds = imagetab.image_dataset(sf_dir).select_columns(["x", "y"])

    def cell_fn(t: pa.Table) -> pa.Table:
        cx = np.floor(t["x"].to_numpy() / imagetab.CELL_SIZE).astype(np.int64)
        cy = np.floor(t["y"].to_numpy() / imagetab.CELL_SIZE).astype(np.int64)
        return pa.table({"cx": pa.array(cx), "cy": pa.array(cy),
                         "_one": pa.array(np.ones(len(cx), dtype=np.int64))})

    cells = grouped_agg(
        ds.map_batches(cell_fn, batch_format="pyarrow", batch_size=None,
                       zero_copy_batch=True),
        ["cx", "cy"], [("_one", "sum")], ["n"], plan="tree")
    t = cells.take_all()  # lattice-bounded: ≤ (100/5)² rows by contract
    cx = np.array([r["cx"] for r in t], dtype=np.int64)
    cy = np.array([r["cy"] for r in t], dtype=np.int64)
    n = np.array([r["n"] for r in t], dtype=np.int64)
    N = len(n)
    S = int(n.sum())
    a = N * n - S  # scaled deviations (×N), exact int64
    # rook neighbor pairs among occupied cells (both directions)
    key = cx * np.int64(1 << 20) + cy
    idx = {int(k): i for i, k in enumerate(key)}
    num = 0
    W = 0
    for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
        nk = (cx + dx) * np.int64(1 << 20) + (cy + dy)
        for i, k in enumerate(nk):
            j = idx.get(int(k))
            if j is not None:
                W += 1
                num += int(a[i]) * int(a[j])
    den = int((a.astype(object) * a.astype(object)).sum())
    # degenerate lattices: no adjacent pairs (W=0) or a zero-variance
    # field (den=0) have no defined statistic → 0.0
    morans = ((float(N) * float(num)) / (float(W) * float(den))
              if W > 0 and den > 0 else 0.0)
    return pa.table({
        "n_cells": pa.array([N], type=pa.int64()),
        "w_pairs": pa.array([W], type=pa.int64()),
        "morans_i": pa.array([morans], type=pa.float64())})


def _q_aspect_buckets(sf_dir):
    """ASPECT-RATIO BUCKETING (the SDXL multi-resolution training trick):
    every image snaps to the nearest of 7 canonical aspect ratios and
    the pipeline reports per-bucket image count + total pixels.  The
    argmin over |w/h − p/q| is EXACT integer arithmetic — the common
    denominator h cancels, so score_b = |w·q_b − h·p_b| · (12 / q_b)
    (12 = lcm of the q's) ranks buckets with no float anywhere; ties
    break to the smaller bucket index (np.argmin == SQL row_number
    ORDER BY score, bucket).  Pure streaming map + a 7-key
    combiner-first count: zero all-to-alls at any image count."""
    import ray.data

    from engine.rayds import imagetab
    from engine.rayds.shuffle import grouped_agg

    # (p, q) canonical ratios; q divides 12 for the exact common scale
    ratios = [(1, 2), (2, 3), (3, 4), (1, 1), (4, 3), (3, 2), (2, 1)]

    ds = imagetab.image_dataset(sf_dir).select_columns(["w", "h"])

    def assign(t: pa.Table) -> pa.Table:
        w = t["w"].to_numpy().astype(np.int64)
        h = t["h"].to_numpy().astype(np.int64)
        scores = np.stack([np.abs(w * q - h * p) * (12 // q)
                           for p, q in ratios], axis=1)
        b = np.argmin(scores, axis=1).astype(np.int64)
        return pa.table({"bucket": pa.array(b),
                         "_one": pa.array(np.ones(len(b), dtype=np.int64)),
                         "_px": pa.array(w * h)})

    g = grouped_agg(
        ds.map_batches(assign, batch_format="pyarrow", batch_size=None,
                       zero_copy_batch=True),
        ["bucket"], [("_one", "sum"), ("_px", "sum")],
        ["n_images", "sum_pixels"], plan="tree")

    def label(t: pa.Table) -> pa.Table:
        b = t["bucket"].to_numpy()
        p = np.array([r[0] for r in ratios], dtype=np.int64)[b]
        q = np.array([r[1] for r in ratios], dtype=np.int64)[b]
        return pa.table({"bucket": t["bucket"],
                         "ratio_p": pa.array(p), "ratio_q": pa.array(q),
                         "n_images": t["n_images"],
                         "sum_pixels": t["sum_pixels"]})

    return g.map_batches(label, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True)


def _q_label_balance(sf_dir):
    """CLASS-BALANCED DOWNSAMPLING (the training-mix balancing op):
    every language keeps exactly m docs, m = the smallest class count,
    selected by deterministic md5 priority (pure function of doc_id —
    reproducible at any cluster size/partitioning).  m comes from a
    5-row combiner-first count; the selection is a per-block top-m
    combiner (narrow priority keys only) + ONE exchange on lang; output
    is one row per lang with the kept-set's n and char sum proving set
    identity.  Scale note: m ≈ n/|classes| keeps combiner volume
    proportional to the balanced output, the thing being materialized
    anyway; for extreme m use the per-class exact-kth threshold
    (engine/ops/kth.py) + a filter instead."""
    import ray.data

    from engine.ops.vhash import md5_hex
    from engine.rayds.shuffle import grouped_agg, hash_exchange_groups

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["lang", "doc_id", "n_chars"])
    counts = grouped_agg(
        ds.map_batches(
            lambda t: pa.table({
                "lang": t["lang"],
                "_one": pa.array(np.ones(t.num_rows, dtype=np.int64))}),
            batch_format="pyarrow", batch_size=None, zero_copy_batch=True),
        ["lang"], [("_one", "sum")], ["cnt"], plan="tree")
    m = int(min(r["cnt"] for r in counts.take_all()))

    def topm(tbl: pa.Table) -> pa.Table:
        lang = np.asarray(tbl["lang"].to_pylist(), dtype=object)
        did = tbl["doc_id"].to_numpy()
        nch = tbl["n_chars"].to_numpy()
        h = md5_hex(did.astype(str))
        keep: list[int] = []
        for g in np.unique(lang):
            idx = np.nonzero(lang == g)[0]
            order = np.lexsort((did[idx], h[idx]))[:m]
            keep.extend(idx[order].tolist())
        k = np.sort(np.asarray(keep, dtype=np.int64))
        return pa.table({"lang": pa.array(lang[k]),
                         "doc_id": pa.array(did[k]),
                         "n_chars": pa.array(nch[k])})

    def final(group: pa.Table) -> pa.Table:
        g = topm(group.drop_columns(["_part"]))
        if g.num_rows == 0:
            return pa.table({"lang": pa.array([], type=pa.string()),
                             "n_kept": pa.array([], type=pa.int64()),
                             "sum_chars": pa.array([], type=pa.int64())})
        lang = np.asarray(g["lang"].to_pylist(), dtype=object)
        nch = g["n_chars"].to_numpy()
        order = np.argsort(lang, kind="stable")
        lang, nch = lang[order], nch[order]
        new = np.ones(len(lang), dtype=bool)
        new[1:] = lang[1:] != lang[:-1]
        starts = np.nonzero(new)[0]
        return pa.table({
            "lang": pa.array(lang[starts]),
            "n_kept": pa.array(np.diff(np.append(starts, len(lang)))
                               .astype(np.int64)),
            "sum_chars": pa.array(
                np.add.reduceat(nch, starts).astype(np.int64))})

    local = ds.map_batches(topm, batch_format="pyarrow", batch_size=None,
                           zero_copy_batch=True)
    return hash_exchange_groups(local, ["lang"], final)


def _q_spearman_corr(sf_dir):
    """EXACT DISTRIBUTED SPEARMAN RANK CORRELATION (quantity × price):
    average-tie ranks are rationals with denominator 2, so DOUBLED
    ranks r2 = 2·|{v' ≤ v}| − cnt(v) + 1 are exact int64 and Pearson
    over them IS Spearman (affine invariance).  The rank map is built
    scale-correctly: combiner-first distinct-value counts → ONE Ray
    range sort of the DISTINCT table (581k rows at sf0.1, never the
    stream) → the two-phase prefix-sum scan (engine/ops/scan.py — 3
    ints per block to the driver) → doubled ranks attach back to rows
    through the adaptive equi-join (quantity's 50-value map rides the
    broadcast plan, price's hash plan).  Final r = exact integer
    moments (decimal128 tree fold, zero extra shuffles) through
    pearson_from_moments' fixed float order — bit-identical to the
    window-function SQL oracle."""
    import ray.data

    from engine.ops.rank import doubled_rank_map
    from engine.ops.stats import exact_moments, pearson_from_moments
    from engine.rayds.shuffle import equi_join

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_quantity", "l_extendedprice"])

    def ints(batch: pa.Table) -> pa.Table:
        q = np.rint(batch["l_quantity"].to_numpy(
            zero_copy_only=False)).astype(np.int64)
        c = np.rint(batch["l_extendedprice"].to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)
        return pa.table({"x": pa.array(q), "y": pa.array(c)})

    rows = li.map_batches(ints, batch_format="pyarrow", batch_size=None,
                          zero_copy_batch=True).materialize()

    # DRIVER-FOLDED rank maps (fast path): per-block value-count
    # partials are plainly SUMMABLE (no distinctness requirement), the
    # distinct-value tables are vocabulary-sized (50 quantities, ~581k
    # price cents at sf0.1), and the doubled ranks are one sorted
    # cumsum — replaces two rank-map builds (sort + scan each) and two
    # rank-attach equi-joins.  Past the budget the sort-based
    # doubled_rank_map plan below applies.
    def vc_partial(t: pa.Table) -> pa.Table:
        xv, xc = np.unique(t["x"].to_numpy(), return_counts=True)
        yv, yc = np.unique(t["y"].to_numpy(), return_counts=True)
        return pa.table({
            "axis": pa.array(np.r_[np.zeros(len(xv), np.int64),
                                   np.ones(len(yv), np.int64)]),
            "v": pa.array(np.r_[xv, yv]),
            "c": pa.array(np.r_[xc, yc].astype(np.int64))})

    budget_ok = True
    ax, vv, cc, tot = [], [], [], 0
    for b in rows.map_batches(vc_partial, batch_format="pyarrow",
                              batch_size=None).iter_batches(
            batch_format="pyarrow"):
        ax.append(b["axis"].to_numpy())
        vv.append(b["v"].to_numpy())
        cc.append(b["c"].to_numpy())
        tot += len(b)
        if tot > _FOLD_BUDGET:
            budget_ok = False
            break
    if budget_ok:
        import ray as _ray

        axa = np.concatenate(ax) if ax else np.empty(0, np.int64)
        vva = np.concatenate(vv) if vv else np.empty(0, np.int64)
        cca = np.concatenate(cc) if cc else np.empty(0, np.int64)
        maps = []
        for a in (0, 1):
            m_ = axa == a
            v, c = vva[m_], cca[m_]
            o = np.argsort(v, kind="stable")
            v, c = v[o], c[o]
            s = np.flatnonzero(np.r_[True, v[1:] != v[:-1]])                 if len(v) else np.empty(0, np.int64)
            vu = v[s]
            cu = np.add.reduceat(c, s) if len(v) else c
            cum = np.cumsum(cu)
            r2 = 2 * cum - cu + 1  # doubled average-tie rank
            maps.append((vu, r2))
        rref = _ray.put(tuple(maps))

        def attach(t: pa.Table) -> pa.Table:
            from engine.rayds.bcast import cached

            (xv_, xr_), (yv_, yr_) = cached(rref)
            x = t["x"].to_numpy()
            y = t["y"].to_numpy()
            return pa.table({
                "r2x": pa.array(xr_[np.searchsorted(xv_, x)]),
                "r2y": pa.array(yr_[np.searchsorted(yv_, y)])})

        withxy = rows.map_batches(attach, batch_format="pyarrow",
                                  batch_size=None)
    else:
        withx = equi_join(rows, doubled_rank_map(rows, "x", "r2x"),
                          "x", "x", ["y"], ["r2x"])
        withxy = equi_join(withx, doubled_rank_map(rows, "y", "r2y"),
                           "y", "y", ["r2x"], ["r2y"])
    m = exact_moments(withxy, "r2x", "r2y")
    r = pearson_from_moments(m)
    return pa.table({"n": pa.array([m["n"]], type=pa.int64()),
                     "spearman": pa.array([r], type=pa.float64())})


def _q_dasymetric_alloc(sf_dir):
    """DASYMETRIC AREAL INTERPOLATION (raster↔vector disaggregation):
    each polygon's value (synthetic population 1000·(poly_id+1))
    redistributes onto its 4×4 tiles weighted by OBSERVED image density
    — alloc(tile) = pop·n_tile / n_poly, exact integers until the one
    final float division (mirrored verbatim in SQL).  Composition:
    the distributed two-phase cell-join tile counts (salted) → a
    layer-bounded per-poly rollup (tree) → broadcast join back."""
    from engine.rayds import pipeline
    from engine.rayds.shuffle import grouped_agg, tree_fold_refs

    tc = pipeline.tile_counts(sf_dir, salted=True).materialize()
    totals = tree_fold_refs(
        grouped_agg(tc, ["poly_id"], [("n_images", "sum")], ["n_poly"],
                    plan="tree"),
        lambda tbls: pa.concat_tables(tbls))
    pkeys = totals["poly_id"].to_numpy(zero_copy_only=False)
    pvals = totals["n_poly"].to_numpy(zero_copy_only=False)
    order = np.argsort(pkeys)
    pkeys, pvals = pkeys[order], pvals[order]

    def alloc(t: pa.Table) -> pa.Table:
        pid = t["poly_id"].to_numpy()
        n = t["n_images"].to_numpy()
        npoly = pvals[np.searchsorted(pkeys, pid)]
        pop = (pid + 1) * 1000
        a = (pop * n).astype(np.float64) / npoly.astype(np.float64)
        return pa.table({"poly_id": t["poly_id"], "tile_id": t["tile_id"],
                         "n_images": t["n_images"],
                         "alloc": pa.array(a)})

    return tc.map_batches(alloc, batch_format="pyarrow", batch_size=None,
                          zero_copy_batch=True)


def _q_daily_autocorr(sf_dir):
    """LAG-1 AUTOCORRELATION of the daily event-count series (the
    seasonality screen): dense calendar counts (gap days = 0) from
    combiner-first day counts — the series is CALENDAR-BOUNDED, so the
    quadratic form runs driver-side over days, never rows; all moments
    are exact python ints and the final r is pearson_from_moments'
    fixed float expression, mirrored by the generate_series + LEAD SQL
    oracle."""
    import ray.data

    from engine.ops.stats import pearson_from_moments
    from engine.rayds.shuffle import grouped_count

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])

    def day_fn(t: pa.Table) -> pa.Table:
        day = (t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
               // 86_400_000_000)
        return pa.table({"day": pa.array(day.astype(np.int64))})

    counts = grouped_count(
        ds.map_batches(day_fn, batch_format="pyarrow", batch_size=None,
                       zero_copy_batch=True), ["day"], out_col="n")
    t = pa.concat_tables(
        [b for b in counts.iter_batches(batch_format="pyarrow")])
    day = t["day"].to_numpy()
    n = t["n"].to_numpy()
    lo, hi = int(day.min()), int(day.max())
    dense = np.zeros(hi - lo + 1, dtype=np.int64)
    dense[day - lo] = n
    x, y = dense[:-1], dense[1:]
    m = {"n": len(x), "sx": int(x.sum()), "sy": int(y.sum()),
         "sxx": int((x.astype(object) * x).sum()),
         "syy": int((y.astype(object) * y).sum()),
         "sxy": int((x.astype(object) * y).sum())}
    r = pearson_from_moments(m)
    return pa.table({"n_days": pa.array([len(dense)], type=pa.int64()),
                     "autocorr": pa.array([r], type=pa.float64())})


def _q_cdc_state(sf_dir):
    """CDC / CHANGELOG MERGE (the Hudi/Delta upsert-compaction op):
    events are a changelog — 'error' rows are DELETE markers, everything
    else upserts the user's value; the final state is each user's last
    op by (ts, event_id), surviving only if it wasn't a delete.  The
    per-key argmax is associative, so a per-block combiner keeps one
    row per (key, block) and the ONE exchange moves keys × blocks rows,
    never the stream (latest_event's plan + tombstone semantics)."""
    import ray.data

    from engine.rayds.shuffle import hash_exchange_groups

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        cents = np.floor(t["value"].to_numpy() * 100.0).astype(np.int64)
        et = t["event_type"].to_numpy(zero_copy_only=False)
        return pa.table({
            "user_id": t["user_id"],
            "ts_us": t["ts"].cast(pa.int64()),
            "event_id": t["event_id"],
            "is_del": pa.array(et == "error"),
            "cents": pa.array(cents)})

    def block_last(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        u = t["user_id"].to_numpy()
        s = t["ts_us"].to_numpy()
        e = t["event_id"].to_numpy()
        order = np.lexsort((e, s, u))
        last = np.ones(len(u), dtype=bool)
        last[:-1] = u[order][1:] != u[order][:-1]
        return t.take(pa.array(order[last]))

    def final(group: pa.Table) -> pa.Table:
        g = block_last(group.drop_columns(["_part"]))
        if g.num_rows == 0:
            return pa.table({"user_id": pa.array([], type=pa.int64()),
                             "last_cents": pa.array([], type=pa.int64())})
        keep = pa.compute.invert(g["is_del"])
        g = g.filter(keep)
        return pa.table({"user_id": g["user_id"],
                         "last_cents": g["cents"]})

    local = ds.map_batches(prep, batch_format="pyarrow", batch_size=None,
                           zero_copy_batch=True).map_batches(
        block_last, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True)
    return hash_exchange_groups(local, ["user_id"], final)


def _q_json_roundtrip(sf_dir):
    """JSONL SOURCE/SINK roundtrip: an integer projection of events
    writes through Ray's native partitioned write_json and reads back
    through read_json into the usual combiner-first rollup — the oracle
    aggregates the ORIGINAL table, so the check is lossless-roundtrip +
    aggregation (integer columns keep the text exact)."""
    import hashlib
    import shutil

    import ray.data

    from engine.rayds.shuffle import grouped_agg

    out = ("/tmp/graft_json_roundtrip_"
           + hashlib.md5(sf_dir.encode()).hexdigest()[:12])
    shutil.rmtree(out, ignore_errors=True)
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "value"])

    def ints(batch: pa.Table) -> pa.Table:
        c = np.floor(batch["value"].to_numpy() * 100.0).astype(np.int64)
        return pa.table({"event_type": batch["event_type"],
                         "cents": pa.array(c)})

    ev.map_batches(ints, batch_format="pyarrow", batch_size=None,
                   zero_copy_batch=True).write_json(out)
    back = ray.data.read_json(out)
    return grouped_agg(back, ["event_type"], [("cents", "sum")],
                       ["sum_cents"], plan="tree")


def _q_wds_shards(sf_dir):
    """WEBDATASET-STYLE TAR SHARD EXPORT (the training-data packaging
    sink) + read-back: every payload batch writes one POSIX tar shard
    ({image_id}.{fmt} payload member + {image_id}.txt caption member,
    the WebDataset key convention) with a per-shard manifest row —
    the resumable layout: shard names are a pure function of their
    content's min image number, so a re-run overwrites, never
    duplicates.  The read-back side lists shards from the manifest and
    streams tar members back into per-format caption stats; the SQL
    oracle aggregates the source table, so the check is
    lossless-roundtrip.  Payload BYTES never ride a shuffle — they go
    straight from the codec stage to the tar sink; byte-exactness of
    the payload roundtrip is pinned by pytest."""
    import hashlib
    import os
    import shutil

    import ray.data

    from engine.rayds.imgstage import payload_dataset
    from engine.rayds.shuffle import grouped_agg
    from engine.rayds.wds import read_shard_stats, write_shard_batch

    out = ("/tmp/graft_wds_"
           + hashlib.md5(sf_dir.encode()).hexdigest()[:12])
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)

    manifest = payload_dataset(sf_dir).map_batches(
        lambda t: write_shard_batch(t, out),
        batch_format="pyarrow", batch_size=256).take_all()
    shards = [r["shard"] for r in manifest]

    back = ray.data.from_items(
        [{"path": s} for s in shards]).flat_map(
        lambda row: read_shard_stats(row["path"]).to_pylist())
    return grouped_agg(back, ["fmt"],
                       [("n_images", "sum"), ("sum_caption_chars", "sum")],
                       ["n_images", "sum_caption_chars"], plan="tree")


def _q_getis_ord(sf_dir):
    """GETIS-ORD Gi* HOTSPOT SCORES of the image-point density field
    (queen adjacency + self, over occupied grid cells) — the per-cell
    companion to morans_i's single global statistic.  Per-cell counts
    are combiner-first; the neighbor sums and the standardized score
    run driver-side over the LATTICE-BOUNDED cell table (≤ 400 cells;
    bounded by world/cell_size², never rows).  Everything stays exact
    int until ONE fixed float expression per cell:
    gi = num / sqrt(A · B / (N−1)) with num = N·U_i − S1·W_i,
    A = N·S2 − S1², B = N·W_i − W_i² — mirrored term-for-term in SQL."""
    import math

    import ray.data

    from engine.rayds import imagetab
    from engine.rayds.shuffle import grouped_agg

    ds = imagetab.image_dataset(sf_dir).select_columns(["x", "y"])

    def cell_fn(t: pa.Table) -> pa.Table:
        cx = np.floor(t["x"].to_numpy() / imagetab.CELL_SIZE).astype(np.int64)
        cy = np.floor(t["y"].to_numpy() / imagetab.CELL_SIZE).astype(np.int64)
        return pa.table({"cx": pa.array(cx), "cy": pa.array(cy),
                         "_one": pa.array(np.ones(len(cx), dtype=np.int64))})

    cells = grouped_agg(
        ds.map_batches(cell_fn, batch_format="pyarrow", batch_size=None,
                       zero_copy_batch=True),
        ["cx", "cy"], [("_one", "sum")], ["n"], plan="tree")
    t = cells.take_all()  # lattice-bounded by contract
    cx = np.array([r["cx"] for r in t], dtype=np.int64)
    cy = np.array([r["cy"] for r in t], dtype=np.int64)
    n = np.array([r["n"] for r in t], dtype=np.int64)
    N = len(n)
    S1 = int(n.sum())
    S2 = int((n.astype(object) * n).sum())
    idx = {(int(a), int(b)): i for i, (a, b) in enumerate(zip(cx, cy))}
    gi = np.zeros(N, dtype=np.float64)
    wi = np.zeros(N, dtype=np.int64)
    A = N * S2 - S1 * S1
    for i in range(N):  # N ≤ lattice cells, driver-side by contract
        U = W = 0
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                j = idx.get((int(cx[i]) + dx, int(cy[i]) + dy))
                if j is not None:
                    W += 1
                    U += int(n[j])
        num = N * U - S1 * W
        B = N * W - W * W
        wi[i] = W
        # degenerate lattices guard: a single cell (N=1) or a
        # zero-variance field (A=0) has no defined z-score → 0.0
        gi[i] = (float(num) / math.sqrt(float(A) * float(B) / float(N - 1))
                 if B > 0 and A > 0 and N > 1 else 0.0)
    return pa.table({"cx": pa.array(cx), "cy": pa.array(cy),
                     "n": pa.array(n), "w_i": pa.array(wi),
                     "gi_star": pa.array(gi)})


def _q_pushdown_read(sf_dir):
    """PREDICATE + PROJECTION PUSHDOWN at the source (the "prune at the
    read" rule made explicit): the parquet scan itself evaluates
    ``value > 300`` (row-group statistics skip whole groups; surviving
    rows filter before leaving the read task) and only 2 of 6 columns
    ever leave storage.  Everything downstream is the standard
    combiner-first rollup."""
    import pyarrow.compute as pc
    import ray.data

    from engine.rayds.shuffle import grouped_agg

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"],
        filter=pc.field("value") > 300.0)

    def cents(batch: pa.Table) -> pa.Table:
        c = np.floor(batch["value"].to_numpy() * 100.0).astype(np.int64)
        one = np.ones(len(c), dtype=np.int64)
        return pa.table({"event_type": batch["event_type"],
                         "cents": pa.array(c), "_one": pa.array(one)})

    return grouped_agg(
        ds.map_batches(cents, batch_format="pyarrow", batch_size=None,
                       zero_copy_batch=True),
        ["event_type"], [("_one", "sum"), ("cents", "sum")],
        ["n_big", "sum_cents"], plan="tree",
        empty_schema=pa.schema([("event_type", pa.string()),
                                ("n_big", pa.int64()),
                                ("sum_cents", pa.int64())]))


def _q_rank_sums(sf_dir):
    """KRUSKAL-WALLIS RANK SUMS per group (the nonparametric ANOVA
    building block): every event's value takes its GLOBAL doubled
    average-tie rank (exact int64, engine/ops/rank.py) and the per-type
    rank sums are exact integer aggregates — distinct-value counts →
    one sort of the distinct table → prefix-sum scan → one rank-attach
    join → combiner-first sums.  The H statistic is one driver
    expression away; the exact rank sums are what the oracle hashes."""
    import ray.data

    from engine.ops.rank import doubled_rank_map
    from engine.rayds.shuffle import equi_join, grouped_agg

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "value"])

    def ints(batch: pa.Table) -> pa.Table:
        c = np.floor(batch["value"].to_numpy() * 100.0).astype(np.int64)
        return pa.table({"event_type": batch["event_type"],
                         "c": pa.array(c)})

    rows = ds.map_batches(ints, batch_format="pyarrow", batch_size=None,
                          zero_copy_batch=True).materialize()
    joined = equi_join(rows, doubled_rank_map(rows, "c", "r2"), "c", "c",
                       ["event_type"], ["r2"])
    one = joined.map_batches(
        lambda t: pa.table({
            "event_type": t["event_type"], "r2": t["r2"],
            "_one": pa.array(np.ones(t.num_rows, dtype=np.int64))}),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    return grouped_agg(one, ["event_type"],
                       [("_one", "sum"), ("r2", "sum")],
                       ["n_g", "r2_sum"], plan="tree")


def _q_winsorized(sf_dir):
    """WINSORIZED AGGREGATE (the outlier-robust preprocessing op): clip
    every value to the EXACT global [p01, p99] quantile_disc boundaries
    (both ranks resolve in ONE shared histogram-refinement pass —
    engine/ops/kth.py), then the usual combiner-first rollup.  Clipping
    happens in exact integer cents; boundaries broadcast as two
    scalars."""
    import ray.data

    from engine.ops.kth import quantiles_disc
    from engine.rayds.shuffle import grouped_agg

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "value"])
    dv = ds.map_batches(
        lambda t: pa.table({"v": pa.array(np.floor(
            t["value"].to_numpy() * 100.0))}),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    lo, hi = quantiles_disc(dv, "v", [0.01, 0.99])
    lo_i, hi_i = int(lo), int(hi)

    def clip(batch: pa.Table) -> pa.Table:
        c = np.floor(batch["value"].to_numpy() * 100.0).astype(np.int64)
        w = np.clip(c, lo_i, hi_i)
        return pa.table({"event_type": batch["event_type"],
                         "w": pa.array(w),
                         "_one": pa.array(np.ones(len(w), dtype=np.int64))})

    return grouped_agg(
        ds.map_batches(clip, batch_format="pyarrow", batch_size=None,
                       zero_copy_batch=True),
        ["event_type"], [("_one", "sum"), ("w", "sum")],
        ["n", "sum_wcents"], plan="tree")


def _q_mad_outliers(sf_dir):
    """MEDIAN/MAD ROBUST OUTLIER SCREEN (the heavy-tail-safe z-score):
    med and MAD = median(|x − med|) are both EXACT distributed medians
    (two histogram-refinement passes — the second over the derived
    deviation column, never materialized); outliers are the exact
    integer predicate |c − med| > 3·MAD, counted per type
    combiner-first.  Complements anomaly_zscore's mean/std screen."""
    import ray.data

    from engine.ops.kth import kth_smallest
    from engine.rayds.shuffle import grouped_agg

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "value"])

    def cents_only(t: pa.Table) -> pa.Table:
        return pa.table({"v": pa.array(np.floor(
            t["value"].to_numpy() * 100.0))})

    med = int(kth_smallest(
        ds.map_batches(cents_only, batch_format="pyarrow",
                       batch_size=None, zero_copy_batch=True), "v", q=0.5))

    def dev_only(t: pa.Table) -> pa.Table:
        c = np.floor(t["value"].to_numpy() * 100.0).astype(np.int64)
        return pa.table({"v": pa.array(np.abs(c - med).astype(np.float64))})

    mad = int(kth_smallest(
        ds.map_batches(dev_only, batch_format="pyarrow",
                       batch_size=None, zero_copy_batch=True), "v", q=0.5))

    def flag(t: pa.Table) -> pa.Table:
        c = np.floor(t["value"].to_numpy() * 100.0).astype(np.int64)
        out = (np.abs(c - med) > 3 * mad).astype(np.int64)
        one = np.ones(len(c), dtype=np.int64)
        return pa.table({"event_type": t["event_type"],
                         "_one": pa.array(one), "out": pa.array(out)})

    g = grouped_agg(
        ds.map_batches(flag, batch_format="pyarrow", batch_size=None,
                       zero_copy_batch=True),
        ["event_type"], [("_one", "sum"), ("out", "sum")],
        ["n", "n_outliers"], plan="tree")
    return g.map_batches(
        lambda t: t.append_column(
            "med_cents", pa.array(np.full(t.num_rows, med,
                                          dtype=np.int64))).append_column(
            "mad_cents", pa.array(np.full(t.num_rows, mad,
                                          dtype=np.int64))),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True)


def _q_gini_order_value(sf_dir):
    """EXACT GINI COEFFICIENT of order values (the inequality /
    concentration statistic): from the ranked distinct-value table
    (cum0, cnt per value — engine/ops/rank.py), the sorted-position sum
    Σ i·x_(i) is Σ_v v·(cnt·cum0 + cnt(cnt+1)/2); doubled it stays
    integer, folded to the driver as exact python ints (the distinct
    table's per-block partials can exceed int64, so blocks fold object
    ints like the moment machinery).  G = (T2 − (n+1)·S) / (n·S) — one
    float division of exact integers, mirrored in HUGEINT SQL."""
    import ray.data

    from engine.ops.rank import distinct_counts_ranked

    ds = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                               columns=["o_totalprice"])
    rows = ds.map_batches(
        lambda t: pa.table({"c": pa.array(np.rint(
            t["o_totalprice"].to_numpy() * 100.0).astype(np.int64))}),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    ranked = distinct_counts_ranked(rows, "c")

    def partial(t: pa.Table) -> pa.Table:
        c = t["c"].to_numpy().astype(object)
        cnt = t["cnt"].to_numpy().astype(object)
        cum0 = t["_cum0"].to_numpy().astype(object)
        t2 = int((c * (2 * cnt * cum0 + cnt * (cnt + 1))).sum()) \
            if len(c) else 0
        s = int((c * cnt).sum()) if len(c) else 0
        n = int(cnt.sum()) if len(c) else 0
        d = pa.decimal128(38, 0)
        return pa.table({"t2": pa.array([t2], type=d),
                         "s": pa.array([s], type=d),
                         "n": pa.array([n], type=d)})

    from engine.rayds.shuffle import tree_fold_refs

    folded = tree_fold_refs(
        ranked.map_batches(partial, batch_format="pyarrow",
                           batch_size=None, zero_copy_batch=True),
        lambda tbls: pa.concat_tables(tbls))
    t2 = sum(int(v.as_py()) for v in folded["t2"])
    s = sum(int(v.as_py()) for v in folded["s"])
    n = sum(int(v.as_py()) for v in folded["n"])
    gini = float(t2 - (n + 1) * s) / float(n * s)
    return pa.table({"n": pa.array([n], type=pa.int64()),
                     "gini": pa.array([gini], type=pa.float64())})


def _q_local_supplier_revenue(sf_dir):
    """TPC-H Q5 SHAPE (local-supplier revenue): the 6-table join chain
    customer ⋈ orders ⋈ lineitem ⋈ supplier ⋈ nation, revenue credited
    only when the customer's and supplier's nations match.  Join plan:
    both dimension attaches (orders→customer, lineitem→supplier) ride
    the adaptive equi-join (broadcast at this cardinality, hash past
    the budget); the one genuinely big-big join (lineitem ⋈ filtered
    orders on orderkey) is the engine's hash exchange; the rollup is
    combiner-first on the 25-value nation key, with the nation-name
    attach on the 25-row folded result.  Revenue is exact int64 basis
    points: price_cents · (100 − discount_pct)."""
    import ray.data

    from engine.rayds.shuffle import dim_table, equi_join, grouped_agg

    lo = np.datetime64("1996-01-01T00:00:00", "us").astype(np.int64)
    hi = np.datetime64("1997-01-01T00:00:00", "us").astype(np.int64)

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def owin(t: pa.Table) -> pa.Table:
        d = t["o_orderdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        keep = (d >= lo) & (d < hi)
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "o_custkey": t["o_custkey"]}).filter(
            pa.array(keep))

    ow = orders.map_batches(owin, batch_format="pyarrow", batch_size=None,
                            zero_copy_batch=True)
    cust = dim_table(f"{sf_dir}/customer.parquet",
                     ["c_custkey", "c_nationkey"])
    oc = equi_join(ow, cust, "o_custkey", "c_custkey",
                   ["o_orderkey"], ["c_nationkey"])

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                 "l_discount"])

    def li_bp(t: pa.Table) -> pa.Table:
        pc_ = np.rint(t["l_extendedprice"].to_numpy() * 100.0).astype(
            np.int64)
        d100 = np.rint(t["l_discount"].to_numpy() * 100.0).astype(np.int64)
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "l_suppkey": t["l_suppkey"],
                         "rev_bp": pa.array(pc_ * (100 - d100))})

    supp = dim_table(f"{sf_dir}/supplier.parquet",
                     ["s_suppkey", "s_nationkey"])
    ls = equi_join(
        li.map_batches(li_bp, batch_format="pyarrow", batch_size=None,
                       zero_copy_batch=True),
        supp, "l_suppkey", "s_suppkey", ["l_orderkey", "rev_bp"],
        ["s_nationkey"])

    j = equi_join(ls, oc, "l_orderkey", "o_orderkey",
                  ["rev_bp", "s_nationkey"], ["c_nationkey"])

    def local_only(t: pa.Table) -> pa.Table:
        keep = pa.compute.equal(t["s_nationkey"], t["c_nationkey"])
        f = t.filter(keep)
        return pa.table({"n_nationkey": f["s_nationkey"],
                         "rev_bp": f["rev_bp"]})

    rolled = grouped_agg(
        j.map_batches(local_only, batch_format="pyarrow", batch_size=None,
                      zero_copy_batch=True),
        ["n_nationkey"], [("rev_bp", "sum")], ["revenue_bp"],
        plan="tree",
        empty_schema=pa.schema([("n_nationkey", pa.int32()),
                                ("revenue_bp", pa.int64())]))
    nat = dim_table(f"{sf_dir}/nation.parquet",
                    ["n_nationkey", "n_name"])
    out = equi_join(rolled, nat, "n_nationkey", "n_nationkey",
                    ["revenue_bp"], ["n_name"])
    return out.select_columns(["n_name", "revenue_bp"])


def _q_geohash_counts(sf_dir):
    """GEOHASH cell counts — the engine's bit-exact PUBLIC cell-id
    standard (engine/geo/geohash.py, validated against the published
    reference vector at precisions 1..11): planar x,y map to lat/lng,
    every image takes its precision-3 geohash (two quantizations + one
    Morton dilation + a byte gather, no row loops), counts are
    combiner-first.  The SQL oracle reproduces the dilation chain in
    BIGINT magic-mask arithmetic and the base-32 chars with three fixed
    substr picks — ids hash bit-identically as STRINGS."""
    import ray.data

    from engine.geo.geohash import geohash_encode
    from engine.rayds import imagetab
    from engine.rayds.shuffle import grouped_agg

    ds = imagetab.image_dataset(sf_dir).select_columns(["x", "y"])

    def gh(t: pa.Table) -> pa.Table:
        x = t["x"].to_numpy()
        y = t["y"].to_numpy()
        lat = y * 1.8 - 90.0
        lng = x * 3.6 - 180.0
        g = geohash_encode(lat, lng, 3)
        return pa.table({"gh": pa.array(g),
                         "_one": pa.array(np.ones(len(g), dtype=np.int64))})

    return grouped_agg(
        ds.map_batches(gh, batch_format="pyarrow", batch_size=None,
                       zero_copy_batch=True),
        ["gh"], [("_one", "sum")], ["n_images"])


def _q_lm_quality_flags(sf_dir):
    """CHAR-TRIGRAM LANGUAGE-MODEL QUALITY SCREEN (the KenLM-shaped
    filter of web-scale curation): train a hashed trigram model over
    the English reference slice in ONE streaming pass (per-block
    fixed-512KiB bucket partials, tree-folded — zero exchanges),
    broadcast it once, score every doc's mean log2 probability
    (per-doc sums are strictly sequential reduceat — identical at any
    partitioning), and count flagged low-likelihood docs per lang
    (score < −8.78: the rare-trigram tail of this corpus; a real
    pipeline tunes the cut on a held-out slice).  Hash/log derived
    values ⇒ no SQL oracle; pinned by a brute-force exact-parity pytest
    plus a planted-gibberish separation test."""
    import ray

    import ray.data

    from engine.ops.text import (TRI_BUCKETS, fold_trigram_model,
                                 lm_score_docs, trigram_model_partial)
    from engine.rayds.shuffle import grouped_agg, tree_fold_refs

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["lang", "text"])
    model_t = tree_fold_refs(
        ds.map_batches(trigram_model_partial, batch_format="pyarrow",
                       batch_size=None, zero_copy_batch=True),
        fold_trigram_model)
    cnt = model_t["cnt"].to_numpy().astype(np.float64)
    total = int(cnt.sum())
    ref = ray.put(cnt)

    def flag(batch: pa.Table) -> pa.Table:
        model = ray.get(ref)
        s = lm_score_docs(batch, model, total)
        return pa.table({
            "lang": batch["lang"],
            "_one": pa.array(np.ones(len(s), dtype=np.int64)),
            "flagged": pa.array((s < -8.78).astype(np.int64))})

    return grouped_agg(
        ds.map_batches(flag, batch_format="pyarrow", batch_size=None,
                       zero_copy_batch=True),
        ["lang"], [("_one", "sum"), ("flagged", "sum")],
        ["n_docs", "n_flagged"], plan="tree")


def _q_colocated_join(sf_dir):
    """STORAGE-PARTITIONED (CO-LOCATED) JOIN — zero exchange at query
    time: both tables first land through the clustered sink
    (ckpt.write_hash_partitioned — hive ``part=`` directories keyed by
    the engine's OWN shuffle hash), then the join simply pairs matching
    part directories: one task per bucket joins locally (sorted-key
    searchsorted lookup) and emits its partial rollup; 16 tiny partials
    fold on the driver.  The "pick ONE partitioning key and reuse it"
    principle materialized — the one-time clustering cost amortizes
    across every later join/groupby on the key, which is how a 100 TB
    fact table avoids re-shuffling per query."""
    import hashlib
    import os
    import shutil

    import pyarrow.parquet as _pq
    import ray
    import ray.data

    from engine.rayds.ckpt import write_hash_partitioned

    P = 16
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    li_dir = f"/tmp/graft_clustered_li_{tag}"
    od_dir = f"/tmp/graft_clustered_ord_{tag}"
    shutil.rmtree(li_dir, ignore_errors=True)
    shutil.rmtree(od_dir, ignore_errors=True)
    write_hash_partitioned(
        ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                              columns=["l_orderkey", "l_extendedprice"]),
        li_dir, ["l_orderkey"], P)
    write_hash_partitioned(
        ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                              columns=["o_orderkey", "o_orderpriority"]),
        od_dir, ["o_orderkey"], P)

    @ray.remote
    def join_part(lp: str, op: str) -> pa.Table:
        empty = pa.table({"o_orderpriority": pa.array([], type=pa.string()),
                          "n": pa.array([], type=pa.int64()),
                          "sum_cents": pa.array([], type=pa.int64())})
        if not (os.path.isdir(lp) and os.path.isdir(op)):
            return empty
        lt = _pq.read_table(lp)
        ot = _pq.read_table(op)
        if lt.num_rows == 0 or ot.num_rows == 0:
            return empty
        lk = lt["l_orderkey"].to_numpy()
        cents = np.rint(lt["l_extendedprice"].to_numpy() * 100.0).astype(
            np.int64)
        ok = ot["o_orderkey"].to_numpy()
        pr = np.asarray(ot["o_orderpriority"].to_pylist(), dtype=object)
        order = np.argsort(ok)
        ok_s, pr_s = ok[order], pr[order]
        pos = np.searchsorted(ok_s, lk)
        hit = (pos < len(ok_s))
        pos = np.minimum(pos, len(ok_s) - 1)
        hit &= ok_s[pos] == lk
        pri = pr_s[pos[hit]]
        c = cents[hit]
        cats, codes = np.unique(pri, return_inverse=True)
        n = np.bincount(codes).astype(np.int64)
        s = np.bincount(codes, weights=c).astype(np.int64)
        return pa.table({"o_orderpriority": pa.array(list(cats)),
                         "n": pa.array(n), "sum_cents": pa.array(s)})

    parts = [join_part.remote(f"{li_dir}/part={p}", f"{od_dir}/part={p}")
             for p in range(P)]
    t = pa.concat_tables(ray.get(parts))
    g = t.group_by(["o_orderpriority"]).aggregate(
        [("n", "sum"), ("sum_cents", "sum")])
    return g.rename_columns(["o_orderpriority", "n", "sum_cents"])


def _q_dbscan_cells(sf_dir):
    """GRID-DBSCAN (density-based spatial clustering): dense cells
    (count ≥ mean density — the all-integer predicate n·n_cells ≥ total)
    connect by rook adjacency into clusters; output one row per cluster
    with its min-cell-id label, cell count and point count.  Per-cell
    counts are combiner-first; the clustering runs driver-side over the
    LATTICE-BOUNDED dense set with union-find (the distributed BSP CC
    in engine/ops/graph.py is the unbounded-graph path; this query's
    graph is ≤ 400 nodes by contract).  The SQL oracle reproduces the
    components with a recursive-CTE closure."""
    import ray.data

    from engine.rayds import imagetab
    from engine.rayds.shuffle import grouped_agg

    ds = imagetab.image_dataset(sf_dir).select_columns(["x", "y"])

    def cell_fn(t: pa.Table) -> pa.Table:
        cx = np.floor(t["x"].to_numpy() / imagetab.CELL_SIZE).astype(np.int64)
        cy = np.floor(t["y"].to_numpy() / imagetab.CELL_SIZE).astype(np.int64)
        return pa.table({"cx": pa.array(cx), "cy": pa.array(cy),
                         "_one": pa.array(np.ones(len(cx), dtype=np.int64))})

    cells = grouped_agg(
        ds.map_batches(cell_fn, batch_format="pyarrow", batch_size=None,
                       zero_copy_batch=True),
        ["cx", "cy"], [("_one", "sum")], ["n"], plan="tree")
    t = cells.take_all()  # lattice-bounded by contract
    cx = np.array([r["cx"] for r in t], dtype=np.int64)
    cy = np.array([r["cy"] for r in t], dtype=np.int64)
    n = np.array([r["n"] for r in t], dtype=np.int64)
    nc, s = len(n), int(n.sum())
    dense = n * nc >= s  # n ≥ ceil(total/cells), all-integer
    dcx, dcy, dn = cx[dense], cy[dense], n[dense]
    ids = dcx * 2048 + dcy
    index = {int(i): k for k, i in enumerate(ids)}
    parent = list(range(len(ids)))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for k in range(len(ids)):
        for dx, dy in ((1, 0), (0, 1)):
            j = index.get(int((dcx[k] + dx) * 2048 + (dcy[k] + dy)))
            if j is not None:
                ra, rb = find(k), find(j)
                if ra != rb:
                    parent[rb] = ra
    root_id = np.array([ids[find(k)] for k in range(len(ids))],
                       dtype=np.int64)
    # label = min cell id in the component
    comp_min: dict[int, int] = {}
    for r, i in zip(root_id, ids):
        comp_min[int(r)] = min(comp_min.get(int(r), 1 << 62), int(i))
    lab = np.array([comp_min[int(r)] for r in root_id], dtype=np.int64)
    out_lab, codes = np.unique(lab, return_inverse=True)
    n_cells = np.bincount(codes).astype(np.int64)
    n_points = np.bincount(codes, weights=dn).astype(np.int64)
    return pa.table({"cluster_id": pa.array(out_lab),
                     "n_cells": pa.array(n_cells),
                     "n_points": pa.array(n_points)})


def _q_chi2_topwords(sf_dir):
    """CHI-SQUARE FEATURE SELECTION (the classic discriminative-vocab
    screen): for every (lang, word) the 2×2 contingency chi² against
    the rest of the corpus, keeping the top-5 words per lang.  Doc-term
    presence counts are combiner-first (movement = distinct pairs);
    marginals are a lang-count rollup + a word-count rollup over the
    SAME pair table; chi² = N·(ad−bc)² / ((a+b)(c+d)(a+c)(b+d)) — exact
    integers inside, ONE float division per pair in the same IEEE order
    as the SQL oracle; per-lang top-5 by (chi², word) runs in a
    lattice-of-langs-bounded final group stage."""
    import ray.data

    from engine.rayds.shuffle import (grouped_agg, hash_exchange_groups,
                                      tree_fold_refs)

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["lang", "text"])

    def pairs(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        words = pc.split_pattern(t["text"].combine_chunks()
                                 if isinstance(t["text"], pa.ChunkedArray)
                                 else t["text"], " ")
        lang = t["lang"]
        n_per = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(words)
        lang_rep = lang.take(pa.array(np.repeat(
            np.arange(len(n_per), dtype=np.int64), n_per)))
        # per-doc DISTINCT (lang, word): dedupe within doc via doc id
        doc_rep = np.repeat(np.arange(len(n_per), dtype=np.int64), n_per)
        tbl = pa.table({"doc": pa.array(doc_rep), "lang": lang_rep,
                        "word": flat})
        g = tbl.group_by(["doc", "lang", "word"]).aggregate([])
        return pa.table({
            "lang": g["lang"], "word": g["word"],
            "_one": pa.array(np.ones(g.num_rows, dtype=np.int64))})

    lw = grouped_agg(
        ds.map_batches(pairs, batch_format="pyarrow", batch_size=None,
                       zero_copy_batch=True),
        ["lang", "word"], [("_one", "sum")], ["a_cnt"]).materialize()

    # marginals: docs per lang (tiny) and docs-containing-word (vocab)
    ndocs_t = tree_fold_refs(
        grouped_agg(ds.map_batches(
            lambda t: pa.table({
                "lang": t["lang"],
                "_one": pa.array(np.ones(t.num_rows, dtype=np.int64))}),
            batch_format="pyarrow", batch_size=None, zero_copy_batch=True),
            ["lang"], [("_one", "sum")], ["n_lang"], plan="tree"),
        lambda tbls: pa.concat_tables(tbls))
    lang_n = dict(zip(ndocs_t["lang"].to_pylist(),
                      ndocs_t["n_lang"].to_pylist()))
    N = int(sum(lang_n.values()))

    wc = grouped_agg(lw, ["word"], [("a_cnt", "sum")], ["w_cnt"])
    from engine.rayds.shuffle import equi_join
    joined = equi_join(lw, wc, "word", "word", ["lang", "a_cnt"],
                       ["w_cnt"]).map_batches(
        lambda t: t.rename_columns(
            ["word" if c == "_k" else c for c in t.column_names]),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True)

    def score(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_part"])
        if g.num_rows == 0:
            return pa.table({"lang": pa.array([], type=pa.string()),
                             "word": pa.array([], type=pa.string()),
                             "chi2": pa.array([], type=pa.float64())})
        lang = np.asarray(g["lang"].to_pylist(), dtype=object)
        word = np.asarray(g["word"].to_pylist(), dtype=object)
        a = g["a_cnt"].to_numpy()          # docs in lang with word
        w = g["w_cnt"].to_numpy()          # docs with word (all langs)
        nlan = np.array([lang_n[x] for x in lang], dtype=np.int64)
        b = nlan - a                        # in lang, without word
        c = w - a                           # other langs, with word
        d = (N - nlan) - c                  # other langs, without word
        det = a * d - b * c  # |det| ≤ N², exact int64
        # per-factor float casts in a FIXED order (each factor < 2^53 ⇒
        # exactly representable; no int64 overflow at any doc count) —
        # the SQL oracle casts and multiplies in the identical order
        fdet = det.astype(np.float64)
        chi2 = (float(N) * fdet * fdet) / (
            (a + b).astype(np.float64) * (c + d).astype(np.float64)
            * (a + c).astype(np.float64) * (b + d).astype(np.float64))
        out: list[int] = []
        for x in np.unique(lang):  # loop over LANGS (≤5), not rows
            idx = np.nonzero(lang == x)[0]
            order = np.lexsort((word[idx], -chi2[idx]))[:5]
            out.extend(idx[order].tolist())
        k = np.asarray(sorted(out), dtype=np.int64)
        return pa.table({"lang": pa.array(lang[k]),
                         "word": pa.array(word[k]),
                         "chi2": pa.array(chi2[k])})

    return hash_exchange_groups(joined, ["lang"], score)


def _q_q6_revenue(sf_dir):
    """TPC-H Q6 (the filtered-scan aggregate): one streaming pass, the
    predicate prunes at the read where possible, 1-int per-block
    partials tree-fold — zero exchanges.  Revenue in exact basis
    points."""
    import pyarrow.compute as pc
    import ray.data

    from engine.rayds.shuffle import tree_fold_refs

    lo = np.datetime64("1996-01-01T00:00:00", "us").astype(np.int64)
    hi = np.datetime64("1997-01-01T00:00:00", "us").astype(np.int64)
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_shipdate", "l_discount", "l_quantity",
                 "l_extendedprice"],
        filter=pc.field("l_quantity") < 24.0)

    def part(t: pa.Table) -> pa.Table:
        d = t["l_shipdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        disc = np.rint(t["l_discount"].to_numpy() * 100.0).astype(np.int64)
        price = np.rint(t["l_extendedprice"].to_numpy() * 100.0).astype(
            np.int64)
        keep = (d >= lo) & (d < hi) & (disc >= 5) & (disc <= 7)
        rev = int((price[keep] * disc[keep]).sum())
        return pa.table({"rev_bp": pa.array([rev], type=pa.int64()),
                         "n": pa.array([int(keep.sum())],
                                       type=pa.int64())})

    t = tree_fold_refs(
        ds.map_batches(part, batch_format="pyarrow", batch_size=None,
                       zero_copy_batch=True),
        lambda tbls: pa.concat_tables(tbls))
    return pa.table({
        "revenue_bp": pa.array([int(pa.compute.sum(t["rev_bp"]).as_py())],
                               type=pa.int64()),
        "n_items": pa.array([int(pa.compute.sum(t["n"]).as_py())],
                            type=pa.int64())})


def _q_normalize_text_stats(sf_dir):
    """TEXT NORMALIZATION stage (lowercase + collapse whitespace runs +
    strip leading/trailing space — the standard curation cleanup) with
    before/after char counts per lang: pure streaming pyarrow C string
    kernels (utf8_lower, RE2 replace, utf8_trim), combiner-first
    rollup; the SQL oracle applies the identical RE2 pattern."""
    import pyarrow.compute as pc
    import ray.data

    from engine.rayds.shuffle import grouped_agg

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["lang", "text"])

    def norm(t: pa.Table) -> pa.Table:
        s = t["text"]
        lowered = pc.utf8_lower(s)
        collapsed = pc.replace_substring_regex(lowered, r"\s+", " ")
        trimmed = pc.utf8_trim_whitespace(collapsed)
        return pa.table({
            "lang": t["lang"],
            "_one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            "chars_before": pc.utf8_length(s).cast(pa.int64()),
            "chars_after": pc.utf8_length(trimmed).cast(pa.int64())})

    return grouped_agg(
        ds.map_batches(norm, batch_format="pyarrow", batch_size=None,
                       zero_copy_batch=True),
        ["lang"],
        [("_one", "sum"), ("chars_before", "sum"), ("chars_after", "sum")],
        ["n_docs", "chars_before", "chars_after"], plan="tree")


def _q_twap_value(sf_dir):
    """TIME-WEIGHTED AVERAGE (the TWAP/sensor-mean op): per user, each
    value holds until the next event; the mean weights each value by
    its holding duration.  ONE hash exchange on the key; per-partition
    lexsort + vectorized diffs; the numerator Σ cents·Δt_seconds and
    the span stay exact int64 (µs→s keeps products < 2^63 at any
    realistic span), ONE float division mirrored by the LEAD window
    oracle.  Users with a single event emit NULL-free zero-span rows
    excluded (span > 0 filter on both sides)."""
    import ray.data

    from engine.rayds.shuffle import hash_exchange_groups

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts", "event_id",
                                        "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t["user_id"],
            "ts_s": pa.array(t["ts"].cast(pa.int64()).to_numpy(
                zero_copy_only=False) // 1_000_000),
            "event_id": t["event_id"],
            "cents": pa.array(np.floor(
                t["value"].to_numpy() * 100.0).astype(np.int64))})

    def twap(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_part"])
        if g.num_rows == 0:
            return pa.table({"user_id": pa.array([], type=pa.int64()),
                             "twap": pa.array([], type=pa.float64())})
        u = g["user_id"].to_numpy()
        s = g["ts_s"].to_numpy()
        e = g["event_id"].to_numpy()
        c = g["cents"].to_numpy()
        order = np.lexsort((e, s, u))
        u, s, c = u[order], s[order], c[order]
        last = np.ones(len(u), dtype=bool)
        last[:-1] = u[1:] != u[:-1]
        dt = np.zeros(len(u), dtype=np.int64)
        dt[:-1] = s[1:] - s[:-1]
        dt[last] = 0  # the final value of each user holds zero time
        first = np.ones(len(u), dtype=bool)
        first[1:] = u[1:] != u[:-1]
        gid = np.cumsum(first) - 1
        num = np.bincount(gid, weights=c * dt).astype(np.int64)
        span = np.bincount(gid, weights=dt).astype(np.int64)
        uid = u[first]
        keep = span > 0
        return pa.table({
            "user_id": pa.array(uid[keep]),
            "twap": pa.array(num[keep].astype(np.float64)
                             / span[keep].astype(np.float64))})

    local = ds.map_batches(prep, batch_format="pyarrow", batch_size=None,
                           zero_copy_batch=True)
    return hash_exchange_groups(local, ["user_id"], twap)


def _q_snapshot_diff(sf_dir):
    """SNAPSHOT DIFF (the data-versioning change feed): compare two
    table versions — B derives from A by dropping ids ≡0 (mod 11) and
    bumping values on ids ≡0 (mod 7) — and classify every key as
    added/removed/changed/same, reporting counts.  ONE exchange: both
    sides union with a side tag, a per-key combiner keeps (side-mask,
    value-per-side) partials, the final per-key classify is vectorized.
    The full-outer-join-without-a-join plan (presence masks), mirrored
    by a FULL OUTER JOIN oracle."""
    import ray.data

    from engine.rayds.shuffle import grouped_agg, hash_exchange_groups

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "value"])

    def sides(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy()
        c = np.floor(t["value"].to_numpy() * 100.0).astype(np.int64)
        keep_b = eid % 11 != 0
        cb = np.where(eid % 7 == 0, c + 100, c)
        return pa.table({
            "event_id": pa.array(np.concatenate([eid, eid[keep_b]])),
            "a_val": pa.array(np.concatenate(
                [c, np.full(keep_b.sum(), -1, dtype=np.int64)])),
            "b_val": pa.array(np.concatenate(
                [np.full(len(eid), -1, dtype=np.int64), cb[keep_b]]))})

    # per-key combiner: max folds the -1 absent markers away (values
    # are cents ≥ 0, each side appears at most once per key)
    merged = grouped_agg(
        ds.map_batches(sides, batch_format="pyarrow", batch_size=None,
                       zero_copy_batch=True),
        ["event_id"], [("a_val", "max"), ("b_val", "max")],
        ["a_val", "b_val"])

    def classify(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_part"])
        if g.num_rows == 0:
            return pa.table({"status": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64())})
        a = g["a_val"].to_numpy()
        b = g["b_val"].to_numpy()
        status = np.where(
            a < 0, "added", np.where(b < 0, "removed", np.where(
                a != b, "changed", "same"))).astype(object)
        cats, codes = np.unique(status, return_inverse=True)
        return pa.table({
            "status": pa.array(list(cats)),
            "n": pa.array(np.bincount(codes).astype(np.int64))})

    part = hash_exchange_groups(merged, ["event_id"], classify)
    return grouped_agg(part, ["status"], [("n", "sum")], ["n"],
                       plan="tree")


def _q_raster_smooth(sf_dir):
    """RASTER FOCAL OPERATION (3×3 box-sum smoothing of the density
    grid — the hillshade/convolution family): per-cell counts are
    combiner-first; the focal pass runs one vectorized 2-D window sum
    over the LATTICE-BOUNDED dense grid (zero-padded edges), exact
    integers end-to-end.  The SQL oracle sums the 9-neighborhood via a
    bounded self-join."""
    import ray.data

    from engine.rayds import imagetab
    from engine.rayds.shuffle import grouped_agg

    ds = imagetab.image_dataset(sf_dir).select_columns(["x", "y"])

    def cell_fn(t: pa.Table) -> pa.Table:
        cx = np.floor(t["x"].to_numpy() / imagetab.CELL_SIZE).astype(np.int64)
        cy = np.floor(t["y"].to_numpy() / imagetab.CELL_SIZE).astype(np.int64)
        return pa.table({"cx": pa.array(cx), "cy": pa.array(cy),
                         "_one": pa.array(np.ones(len(cx), dtype=np.int64))})

    cells = grouped_agg(
        ds.map_batches(cell_fn, batch_format="pyarrow", batch_size=None,
                       zero_copy_batch=True),
        ["cx", "cy"], [("_one", "sum")], ["n"], plan="tree")
    t = cells.take_all()  # lattice-bounded by contract
    cx = np.array([r["cx"] for r in t], dtype=np.int64)
    cy = np.array([r["cy"] for r in t], dtype=np.int64)
    n = np.array([r["n"] for r in t], dtype=np.int64)
    W = H = int(100.0 / imagetab.CELL_SIZE)
    grid = np.zeros((W + 2, H + 2), dtype=np.int64)  # zero-padded
    grid[cx + 1, cy + 1] = n
    smooth = sum(grid[1 + dx:W + 1 + dx, 1 + dy:H + 1 + dy]
                 for dx in (-1, 0, 1) for dy in (-1, 0, 1))
    # emit only occupied cells (same key set as the input counts)
    return pa.table({"cx": pa.array(cx), "cy": pa.array(cy),
                     "n": pa.array(n),
                     "focal_sum": pa.array(smooth[cx, cy])})


def _q_incremental_rollup(sf_dir):
    """INCREMENTAL VIEW MAINTENANCE (the streaming-warehouse delta
    merge): the standing (event_type, day) rollup updates with a new
    day-range delta WITHOUT rescanning the base — base partials
    (materialized once, the 'stored view state') merge with the
    delta's partials through one tiny combiner; the oracle recomputes
    from scratch, so the check is merge == full recompute.  At 100 TB
    the base partials live in the clustered sink and the delta is the
    day's new files; only delta bytes move."""
    import pyarrow.compute as pc
    import ray.data

    from engine.rayds.shuffle import grouped_agg

    split = pa.scalar(np.datetime64("2024-01-25T00:00:00", "us").item(),
                      type=pa.timestamp("us"))

    def side(pred):
        # delta pruned AT THE READ (row-group stats + in-scan filter) —
        # a schema'd read also keeps an all-empty delta well-typed
        ds = ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_type", "value"],
            filter=pred)

        def fn(t: pa.Table) -> pa.Table:
            c = np.floor(t["value"].to_numpy() * 100.0).astype(np.int64)
            return pa.table({
                "event_type": t["event_type"],
                "_one": pa.array(np.ones(len(c), dtype=np.int64)),
                "cents": pa.array(c)})

        return grouped_agg(
            ds.map_batches(fn, batch_format="pyarrow", batch_size=None,
                           zero_copy_batch=True),
            ["event_type"], [("_one", "sum"), ("cents", "sum")],
            ["n", "sum_cents"], plan="tree",
            empty_schema=pa.schema([("event_type", pa.string()),
                                    ("n", pa.int64()),
                                    ("sum_cents", pa.int64())]))

    base = side(pc.field("ts") < split).materialize()  # the stored view
    delta = side(pc.field("ts") >= split)
    # merge = re-aggregate the two partial sets (associative)
    return grouped_agg(
        base.union(delta), ["event_type"],
        [("n", "sum"), ("sum_cents", "sum")],
        ["n", "sum_cents"], plan="tree")


def _q_mann_whitney(sf_dir):
    """MANN-WHITNEY U (the two-sample nonparametric location test):
    click vs purchase event values.  Doubled average-tie ranks over the
    COMBINED sample come from the shared ranking core; per-group rank
    sums are exact int64, and 2·U_g = Σr2_g − n_g(n_g+1) stays integer
    — the query asserts the U identity 2U₁+2U₂ = 2n₁n₂ before
    returning.  One rank-attach join + a 2-key combiner."""
    import pyarrow.compute as pc
    import ray.data

    from engine.ops.rank import doubled_rank_map
    from engine.rayds.shuffle import equi_join, grouped_agg

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "value"])

    def ints(batch: pa.Table) -> pa.Table:
        f = batch.filter(pc.is_in(batch["event_type"],
                                  value_set=pa.array(["click",
                                                      "purchase"])))
        c = np.floor(f["value"].to_numpy() * 100.0).astype(np.int64)
        return pa.table({"event_type": f["event_type"],
                         "c": pa.array(c)})

    rows = ds.map_batches(ints, batch_format="pyarrow", batch_size=None,
                          zero_copy_batch=True).materialize()
    joined = equi_join(rows, doubled_rank_map(rows, "c", "r2"), "c", "c",
                       ["event_type"], ["r2"])
    one = joined.map_batches(
        lambda t: pa.table({
            "event_type": t["event_type"], "r2": t["r2"],
            "_one": pa.array(np.ones(t.num_rows, dtype=np.int64))}),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    g = grouped_agg(one, ["event_type"],
                    [("_one", "sum"), ("r2", "sum")],
                    ["n_g", "r2_sum"], plan="tree")
    t = pa.concat_tables(
        [b for b in g.iter_batches(batch_format="pyarrow")])
    d = {r["event_type"]: (r["n_g"], r["r2_sum"]) for r in t.to_pylist()}
    n1, s1 = d["click"]
    n2, s2 = d["purchase"]
    u2_click = s1 - n1 * (n1 + 1)
    u2_purchase = s2 - n2 * (n2 + 1)
    assert u2_click + u2_purchase == 2 * n1 * n2  # the U identity
    return pa.table({
        "n_click": pa.array([n1], type=pa.int64()),
        "n_purchase": pa.array([n2], type=pa.int64()),
        "u2_click": pa.array([u2_click], type=pa.int64()),
        "u2_purchase": pa.array([u2_purchase], type=pa.int64())})


def _q_orders_profile(sf_dir):
    """TABLE PROFILING (the data-quality summary pass): one streaming
    scan reduces the orders table to its profile row — row count, null
    count, min/max order date, min/max price cents, distinct status
    count.  Per-block partials are single rows (distinct statuses ride
    as a deduped list — domain-bounded by contract), tree-folded;
    ZERO exchanges."""
    import ray.data

    from engine.rayds.shuffle import tree_fold_refs

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderstatus", "o_totalprice",
                 "o_orderdate"])

    def part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                "n": pa.array([], type=pa.int64()),
                "nulls": pa.array([], type=pa.int64()),
                "min_d": pa.array([], type=pa.int64()),
                "max_d": pa.array([], type=pa.int64()),
                "min_c": pa.array([], type=pa.int64()),
                "max_c": pa.array([], type=pa.int64()),
                "statuses": pa.array([], type=pa.list_(pa.string()))})
        d = t["o_orderdate"].cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        c = np.rint(t["o_totalprice"].to_numpy() * 100.0).astype(np.int64)
        st = np.unique(np.asarray(t["o_orderstatus"].to_pylist(),
                                  dtype=object))
        return pa.table({
            "n": pa.array([t.num_rows], type=pa.int64()),
            "nulls": pa.array([t["o_custkey"].null_count],
                              type=pa.int64()),
            "min_d": pa.array([int(d.min())], type=pa.int64()),
            "max_d": pa.array([int(d.max())], type=pa.int64()),
            "min_c": pa.array([int(c.min())], type=pa.int64()),
            "max_c": pa.array([int(c.max())], type=pa.int64()),
            "statuses": pa.array([list(st)],
                                 type=pa.list_(pa.string()))})

    f = tree_fold_refs(
        ds.map_batches(part, batch_format="pyarrow", batch_size=None,
                       zero_copy_batch=True),
        lambda tbls: pa.concat_tables(tbls))
    import pyarrow.compute as pc
    statuses = set()
    for lst in f["statuses"].to_pylist():
        statuses.update(lst)
    return pa.table({
        "n_rows": pa.array([int(pc.sum(f["n"]).as_py())], type=pa.int64()),
        "n_null_cust": pa.array([int(pc.sum(f["nulls"]).as_py())],
                                type=pa.int64()),
        "min_date_us": pa.array([int(pc.min(f["min_d"]).as_py())],
                                type=pa.int64()),
        "max_date_us": pa.array([int(pc.max(f["max_d"]).as_py())],
                                type=pa.int64()),
        "min_cents": pa.array([int(pc.min(f["min_c"]).as_py())],
                              type=pa.int64()),
        "max_cents": pa.array([int(pc.max(f["max_c"]).as_py())],
                              type=pa.int64()),
        "n_status": pa.array([len(statuses)], type=pa.int64())})


def _q_zorder_range_scan(sf_dir):
    """Z-ORDER INDEX RANGE SCAN (the lakehouse bbox-query mechanic):
    the query bbox decomposes into ≤64 z-contiguous Morton ranges by
    quadtree descent (LITMAX/BIGMIN semantics; budget-capped ranges
    stay a SUPERSET so correctness never depends on the cap), the scan
    prefilters each block by vectorized range membership (one
    searchsorted), then refines with the exact float bbox predicate —
    the two-phase filter an engine runs against a z-clustered table
    where the ranges prune row groups at the read (zorder_top100 shows
    the clustering sort).  Exact-integer outputs; plain-bbox SQL
    oracle."""
    import ray.data

    from engine.ops.zorder import bbox_to_zranges, morton2, zrange_member
    from engine.rayds import imagetab
    from engine.rayds.shuffle import tree_fold_refs

    X0, X1, Y0, Y1 = 22.3, 61.7, 10.0, 45.5
    BITS, WORLD = 10, 100.0
    scale = (1 << BITS) / WORLD
    ranges = bbox_to_zranges(int(np.floor(X0 * scale)),
                             int(np.floor(X1 * scale)),
                             int(np.floor(Y0 * scale)),
                             int(np.floor(Y1 * scale)),
                             BITS, max_ranges=64)

    ds = imagetab.image_dataset(sf_dir).select_columns(["x", "y"])

    def scan(t: pa.Table) -> pa.Table:
        x = t["x"].to_numpy()
        y = t["y"].to_numpy()
        qx = np.floor(x * scale).astype(np.int64)
        qy = np.floor(y * scale).astype(np.int64)
        z = morton2(qx, qy)
        cand = zrange_member(z, ranges)          # index prefilter
        xc, yc = x[cand], y[cand]
        keep = (xc >= X0) & (xc <= X1) & (yc >= Y0) & (yc <= Y1)
        x_milli = np.rint(xc[keep] * 1000.0).astype(np.int64)
        return pa.table({
            "n": pa.array([int(keep.sum())], type=pa.int64()),
            "sx": pa.array([int(x_milli.sum())], type=pa.int64())})

    f = tree_fold_refs(
        ds.map_batches(scan, batch_format="pyarrow", batch_size=None,
                       zero_copy_batch=True),
        lambda tbls: pa.concat_tables(tbls))
    import pyarrow.compute as pc
    return pa.table({
        "n_points": pa.array([int(pc.sum(f["n"]).as_py())],
                             type=pa.int64()),
        "sum_x_milli": pa.array([int(pc.sum(f["sx"]).as_py())],
                                type=pa.int64())})


def _q_video_scenes(sf_dir):
    """VIDEO SCENE-CHANGE DETECTION over the sampled-frame stream: a
    scene cut = consecutive sampled frames whose phash Hamming distance
    exceeds 16 bits.  One hash exchange on the video key co-locates each
    video's frames; the per-partition pass is one lexsort + vectorized
    XOR-popcount; the bounded output is the (n_cuts, n_videos)
    histogram.  Frame phashes come from the deterministic fake codec
    (documented) ⇒ no SQL oracle; pinned by a brute-force parity pytest
    with planted hard cuts."""
    from engine.rayds.imgstage import frames_dataset
    from engine.rayds.shuffle import grouped_agg, hash_exchange_groups

    ds = frames_dataset(sf_dir, every_n=3)

    def cuts(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_part"])
        if g.num_rows == 0:
            return pa.table({"n_cuts": pa.array([], type=pa.int64()),
                             "_one": pa.array([], type=pa.int64())})
        vid = np.asarray(g["image_id"].to_pylist(), dtype=object)
        idx = g["frame_idx"].to_numpy()
        ph = g["frame_phash"].to_numpy()
        order = np.lexsort((idx, vid))
        vid, ph = vid[order], ph[order]
        same = np.zeros(len(vid), dtype=bool)
        same[1:] = vid[1:] == vid[:-1]
        x = np.zeros(len(vid), dtype=np.uint64)
        x[1:] = (ph[1:].view(np.uint64) ^ ph[:-1].view(np.uint64))
        ham = np.unpackbits(x.view(np.uint8).reshape(-1, 8),
                            axis=1).sum(1)
        cut = same & (ham > 16)
        first = ~same
        gid = np.cumsum(first) - 1
        ncuts = np.bincount(gid, weights=cut).astype(np.int64)
        return pa.table({"n_cuts": pa.array(ncuts),
                         "_one": pa.array(np.ones(len(ncuts),
                                                  dtype=np.int64))})

    per_video = hash_exchange_groups(ds, ["image_id"], cuts)
    return grouped_agg(per_video, ["n_cuts"], [("_one", "sum")],
                       ["n_videos"], plan="tree")


def _q_selfjoin_size(sf_dir):
    """JOIN-CARDINALITY STATISTIC (the planner's self-join size): the
    exact output size of events ⋈ events on user_id is Σ_u c_u² — a
    combiner-first per-key count plus one quadratic fold, no join ever
    executed.  The statistic every shuffle-join planner needs before
    committing to an exchange."""
    import ray.data

    from engine.rayds.shuffle import grouped_count, tree_fold_refs

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id"])
    counts = grouped_count(ds, ["user_id"], out_col="c")

    def sq(t: pa.Table) -> pa.Table:
        c = t["c"].to_numpy().astype(object)
        return pa.table({
            "n_keys": pa.array([t.num_rows], type=pa.int64()),
            "jsize": pa.array([int((c * c).sum()) if len(c) else 0],
                              type=pa.int64())})

    f = tree_fold_refs(
        counts.map_batches(sq, batch_format="pyarrow", batch_size=None,
                           zero_copy_batch=True),
        lambda tbls: pa.concat_tables(tbls))
    import pyarrow.compute as pc
    return pa.table({
        "n_users": pa.array([int(pc.sum(f["n_keys"]).as_py())],
                            type=pa.int64()),
        "selfjoin_rows": pa.array([int(pc.sum(f["jsize"]).as_py())],
                                  type=pa.int64())})


def _q_region_hulls(sf_dir):
    """DISTRIBUTED CONVEX-HULL AGGREGATE per region (the geometry
    kernels inside a combiner-first aggregate): hull is associative —
    hull(A ∪ B) = hull(hull(A) ∪ hull(B)) — so each block reduces every
    region's matched points to its hull VERTICES (engine.geo
    constructive.convex_hull, the reference-conformant kernel), one
    fine-key exchange moves only hull rings, and the final hull emits
    (poly_id, n_vertices, area2_micro) with the doubled shoelace area
    in EXACT integer micro-units (coords are milli-grid by
    construction).  Geometry outputs aren't SQL-expressible ⇒ pinned by
    a brute-force monotone-chain pytest."""
    from engine.geo.constructive import convex_hull
    from engine.geo.coordinates import get_coordinates
    from engine.geo.creation import multipoints
    from engine.rayds import pipeline
    from engine.rayds.shuffle import hash_exchange_fine_groups

    pairs = pipeline.pairs_dataset(sf_dir, "covers", keep_cols=())

    def hull_pts(x: np.ndarray, y: np.ndarray) -> np.ndarray:
        g = multipoints(np.column_stack([x, y]))
        return get_coordinates(convex_hull(g))

    def block_hull(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"poly_id": pa.array([], type=pa.int64()),
                             "x": pa.array([], type=pa.float64()),
                             "y": pa.array([], type=pa.float64())})
        pid = t["poly_id"].to_numpy()
        x = t["x"].to_numpy()
        y = t["y"].to_numpy()
        op, ox, oy = [], [], []
        for p in np.unique(pid):  # loop over REGIONS (layer-bounded)
            m = pid == p
            c = hull_pts(x[m], y[m])
            op.extend([int(p)] * len(c))
            ox.extend(c[:, 0].tolist())
            oy.extend(c[:, 1].tolist())
        return pa.table({"poly_id": pa.array(op, type=pa.int64()),
                         "x": pa.array(ox, type=pa.float64()),
                         "y": pa.array(oy, type=pa.float64())})

    local = pairs.map_batches(block_hull, batch_format="pyarrow",
                              batch_size=None, zero_copy_batch=True)

    def final(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({"poly_id": pa.array([], type=pa.int64()),
                             "n_vertices": pa.array([], type=pa.int64()),
                             "area2_micro": pa.array([], type=pa.int64())})
        pid = int(group["poly_id"][0].as_py())
        c = hull_pts(group["x"].to_numpy(), group["y"].to_numpy())
        # drop the closing duplicate if the ring is closed
        if len(c) > 1 and (c[0] == c[-1]).all():
            c = c[:-1]
        xi = np.rint(c[:, 0] * 1000.0).astype(np.int64)
        yi = np.rint(c[:, 1] * 1000.0).astype(np.int64)
        area2 = int(np.abs(
            (xi * np.roll(yi, -1) - np.roll(xi, -1) * yi).sum()))
        return pa.table({
            "poly_id": pa.array([pid], type=pa.int64()),
            "n_vertices": pa.array([len(c)], type=pa.int64()),
            "area2_micro": pa.array([area2], type=pa.int64())})

    return hash_exchange_fine_groups(local, ["poly_id"], final)


def _q_sssp_full(sf_dir):
    """UNBOUNDED-depth weighted shortest paths (distributed
    Bellman-Ford as BSP task rounds — engine/ops/graph.py::sssp) over
    the same derived weighted graph as the fixed-depth sssp_min_cost:
    every reachable node with its true min cost, converging in
    hop-radius rounds with 2 task waves each.  Iterative shared-state
    algorithm ⇒ no SQL oracle (a recursive-CTE closure enumerates
    per-cost paths and blows up on cyclic graphs); pinned by a
    brute-force Bellman-Ford pytest and the ≥-depth-3 consistency
    check against the oracle-checked fixed-depth query."""
    import ray.data

    from engine.ops.graph import sssp
    from engine.rayds.shuffle import grouped_agg

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id"])

    def edges(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy()
        x = eid % np.int64(499)
        y = (eid // np.int64(499) + eid % np.int64(491)) % np.int64(499)
        w = (eid % np.int64(97)) + np.int64(1)
        m = x != y
        return pa.table({"a": pa.array(x[m]), "b": pa.array(y[m]),
                         "w": pa.array(w[m])})

    e = grouped_agg(
        ds.map_batches(edges, batch_format="pyarrow", batch_size=None,
                       zero_copy_batch=True),
        ["a", "b"], [("w", "min")], ["w"])
    return sssp(e, source=0)


def _q_region_dissolve(sf_dir):
    """DISTRIBUTED DISSOLVE (per-group polygon UNION — the GIS verb
    region_hulls' hull aggregate doesn't cover): integer-aligned
    footprint boxes derived from events are unioned per region through
    the engine's arrangement overlay (set_operations._nary_union_areal).
    The box VOCABULARY is domain-bounded (≤480 distinct boxes/region by
    construction — the real-world shape: footprint tiles snap to a
    grid), so each block DEDUPES to distinct boxes (np.unique over one
    packed int64 — the combiner), ONE fine-key exchange moves
    ≤ blocks×480 narrow rows, and union_all runs once per region over
    the bounded distinct set.  Integer box coords make the overlay
    float-EXACT, so union area == covered-unit-cell count — the SQL
    oracle counts DISTINCT cells, which would catch any overlay
    assembly bug (the pinch-wrap shell double-count fixed this round
    was found exactly this way; tests/test_union_pinch.py)."""
    import ray.data

    from engine.geo.creation import box as _mkbox
    from engine.geo.measure import area as _area
    from engine.geo.set_operations import union_all
    from engine.rayds.shuffle import hash_exchange_fine_groups

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id"])

    def distinct_boxes(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy()
        region = eid % np.int64(6)
        x0 = eid % np.int64(24)
        y0 = (eid // np.int64(24)) % np.int64(20)
        key = np.unique((region * 24 + x0) * 20 + y0)  # w,h derive from x0,y0
        return pa.table({"region": pa.array(key // (24 * 20)),
                         "x0": pa.array((key // 20) % 24),
                         "y0": pa.array(key % 20)})

    local = ds.map_batches(distinct_boxes, batch_format="pyarrow",
                           batch_size=None, zero_copy_batch=True)

    def dissolve(group: pa.Table) -> pa.Table:
        empty = pa.table({"region": pa.array([], type=pa.int64()),
                          "n_boxes": pa.array([], type=pa.int64()),
                          "union_area": pa.array([], type=pa.int64())})
        if group.num_rows == 0:
            return empty
        region = int(group["region"][0].as_py())
        x0 = group["x0"].to_numpy()
        y0 = group["y0"].to_numpy()
        key = np.unique(x0 * 20 + y0)  # re-dedupe across blocks
        x0 = (key // 20).astype(np.float64)
        y0 = (key % 20).astype(np.float64)
        w = 1.0 + (x0 + y0) % 3
        h = 1.0 + (x0 * 3 + y0) % 5
        u = union_all(_mkbox(x0, y0, x0 + w, y0 + h))
        return pa.table({
            "region": pa.array([region], type=pa.int64()),
            "n_boxes": pa.array([len(key)], type=pa.int64()),
            "union_area": pa.array([int(_area(u))], type=pa.int64())})

    return hash_exchange_fine_groups(local, ["region"], dissolve)


def _q_ohlc_daily(sf_dir):
    """OHLC RESAMPLING (time-series downsample): per-day open/high/low/
    close of the value stream ordered by (ts, event_id).  Open/close are
    per-key ARGMIN/ARGMAX by a composite order — associative, so each
    block keeps one partial row per day (lexsort + first/last-of-run)
    and the day table is CALENDAR-BOUNDED ⇒ partials tree-fold to one
    block with the SAME fold applied at every level; no all-to-all at
    any volume."""
    import ray.data

    from engine.rayds.shuffle import tree_fold_refs

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "event_id", "value"])

    def _fold(day, ts, eid, oc, cc, lo, hi) -> pa.Table:
        """Merge partial OHLC rows: per day, open fields ride the row
        with min (ts, eid), close fields the row with max, lo/hi fold
        by min/max — emitted as ONE row per day."""
        if len(day) == 0:
            i64 = pa.array([], type=pa.int64())
            return pa.table({c: i64 for c in
                             ("day", "o_ts", "o_eid", "open_cents", "c_ts",
                              "c_eid", "close_cents", "low_cents",
                              "high_cents")})
        order = np.lexsort((eid, ts, day))
        day, ts, eid = day[order], ts[order], eid[order]
        oc, cc, lo, hi = oc[order], cc[order], lo[order], hi[order]
        first = np.ones(len(day), dtype=bool)
        first[1:] = day[1:] != day[:-1]
        starts = np.nonzero(first)[0]
        ends = np.append(starts[1:], len(day))
        return pa.table({
            "day": pa.array(day[starts]),
            "o_ts": pa.array(ts[starts]),
            "o_eid": pa.array(eid[starts]),
            "open_cents": pa.array(oc[starts]),
            "c_ts": pa.array(ts[ends - 1]),
            "c_eid": pa.array(eid[ends - 1]),
            "close_cents": pa.array(cc[ends - 1]),
            "low_cents": pa.array(np.minimum.reduceat(lo, starts)),
            "high_cents": pa.array(np.maximum.reduceat(hi, starts))})

    def partial(t: pa.Table) -> pa.Table:
        ts = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        cents = np.floor(t["value"].to_numpy() * 100.0).astype(np.int64)
        return _fold(ts // 86_400_000_000, ts,
                     t["event_id"].to_numpy(), cents, cents, cents, cents)

    def combine(tbls: list[pa.Table]) -> pa.Table:
        t = pa.concat_tables(tbls).combine_chunks()
        # open/close candidates are rows (o_ts,o_eid)/(c_ts,c_eid); fold
        # treats each partial row twice: once as an open candidate, once
        # as a close candidate — concat the two views
        o = pa.table({"day": t["day"], "ts": t["o_ts"], "eid": t["o_eid"],
                      "oc": t["open_cents"], "cc": t["open_cents"],
                      "lo": t["low_cents"], "hi": t["high_cents"]})
        c = pa.table({"day": t["day"], "ts": t["c_ts"], "eid": t["c_eid"],
                      "oc": t["close_cents"], "cc": t["close_cents"],
                      "lo": t["low_cents"], "hi": t["high_cents"]})
        v = pa.concat_tables([o, c])
        return _fold(*(v[k].to_numpy() for k in
                       ("day", "ts", "eid", "oc", "cc", "lo", "hi")))

    part = ds.map_batches(partial, batch_format="pyarrow", batch_size=None,
                          zero_copy_batch=True)
    final = tree_fold_refs(part, combine)
    import ray.data as _rd
    return _rd.from_arrow(final.select(
        ["day", "open_cents", "high_cents", "low_cents", "close_cents"]))


def _q_xcorr_lag(sf_dir):
    """DAILY CROSS-CORRELATION (lead-lag screen between two event
    streams): exact integer dot products Σ x_t·y_{t+lag} of the dense
    click/purchase daily-count series at lags 0..7.  One combiner-first
    (day, type) count — the series is CALENDAR-BOUNDED so the lag sweep
    is a driver-side numpy dot over days, never rows (daily_autocorr's
    plan generalized to two series × 8 lags); all values exact int64."""
    import ray.data

    from engine.rayds.shuffle import grouped_count

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "event_type"])

    def day_fn(t: pa.Table) -> pa.Table:
        et = t["event_type"].to_numpy(zero_copy_only=False)
        m = (et == "click") | (et == "purchase")
        day = (t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
               // 86_400_000_000)[m]
        return pa.table({"day": pa.array(day),
                         "is_click": pa.array(et[m] == "click")})

    counts = grouped_count(
        ds.map_batches(day_fn, batch_format="pyarrow", batch_size=None,
                       zero_copy_batch=True), ["day", "is_click"])
    batches = [b for b in counts.iter_batches(batch_format="pyarrow")]
    lags = np.arange(8, dtype=np.int64)
    t = pa.concat_tables(batches) if batches else None
    if t is None or t.num_rows == 0:  # no click/purchase rows:
        # the oracle emits 8 zero dots
        return pa.table({"lag": pa.array(lags),
                         "dot": pa.array([0] * 8, type=pa.int64())})
    day = t["day"].to_numpy()
    isc = t["is_click"].to_numpy(zero_copy_only=False)
    n = t["cnt"].to_numpy()
    lo, hi = int(day.min()), int(day.max())
    x = np.zeros(hi - lo + 1, dtype=np.int64)
    y = np.zeros(hi - lo + 1, dtype=np.int64)
    x[day[isc] - lo] = n[isc]
    y[day[~isc] - lo] = n[~isc]
    dots = [int(x[: len(x) - k] @ y[k:]) if k < len(x) else 0
            for k in range(8)]
    return pa.table({"lag": pa.array(lags),
                     "dot": pa.array(dots, type=pa.int64())})


def _q_simpson_diversity(sf_dir):
    """PER-KEY SIMPSON DIVERSITY INDEX (behavioral-mix screen):
    1 − Σ(c_i/n)² of each user's event-type distribution, computed as
    the exact rational (n² − Σc²)/n² — ONE float division per user, no
    libm (the bm25/idf bit-exactness rule).  Per-block (user, type)
    count partials (pyarrow group_by combiner), ONE hash exchange on
    user_id, then a fully vectorized per-partition fold (lexsort +
    reduceat twice: type-count merge, then per-user moments)."""
    import ray.data

    from engine.rayds.shuffle import hash_exchange_groups

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["user_id", "event_type"]).aggregate(
            [("user_id", "count")])
        return g.rename_columns(["user_id", "event_type", "c"])

    local = ds.map_batches(partial, batch_format="pyarrow", batch_size=None,
                           zero_copy_batch=True)

    def fold(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["_part"])
        if t.num_rows == 0:
            return pa.table({"user_id": pa.array([], type=pa.int64()),
                             "n_events": pa.array([], type=pa.int64()),
                             "simpson": pa.array([], type=pa.float64())})
        u = t["user_id"].to_numpy()
        ty = t["event_type"].to_numpy(zero_copy_only=False)
        c = t["c"].to_numpy()
        _, tcode = np.unique(ty, return_inverse=True)
        order = np.lexsort((tcode, u))
        u, tcode, c = u[order], tcode[order], c[order]
        new = np.ones(len(u), dtype=bool)
        new[1:] = (u[1:] != u[:-1]) | (tcode[1:] != tcode[:-1])
        starts = np.nonzero(new)[0]
        cm = np.add.reduceat(c, starts)          # merged (user,type) counts
        um = u[starts]
        ustarts = np.nonzero(np.concatenate(
            [[True], um[1:] != um[:-1]]))[0]
        n = np.add.reduceat(cm, ustarts)
        s = np.add.reduceat(cm * cm, ustarts)
        n2 = n * n
        return pa.table({
            "user_id": pa.array(um[ustarts]),
            "n_events": pa.array(n),
            "simpson": pa.array((n2 - s).astype(np.float64)
                                / n2.astype(np.float64))})

    return hash_exchange_groups(local, ["user_id"], fold)


def _dense_daily(sf_dir, value: str | None = None):
    """Shared dense-calendar helper: (lo, dense int64 array) of daily
    counts (value=None) or daily summed cents — combiner-first day
    rollup, CALENDAR-BOUNDED driver fold (the daily_autocorr plan)."""
    import ray.data

    from engine.rayds.shuffle import grouped_agg, grouped_count

    cols = ["ts"] + ([value] if value else [])
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=cols)

    def day_fn(t: pa.Table) -> pa.Table:
        day = (t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
               // 86_400_000_000)
        out = {"day": pa.array(day.astype(np.int64))}
        if value:
            out["cents"] = pa.array(
                np.floor(t[value].to_numpy() * 100.0).astype(np.int64))
        return pa.table(out)

    mapped = ds.map_batches(day_fn, batch_format="pyarrow", batch_size=None,
                            zero_copy_batch=True)
    if value:
        agg = grouped_agg(mapped, ["day"], [("cents", "sum")], ["v"])
    else:
        agg = grouped_count(mapped, ["day"], out_col="v")
    t = pa.concat_tables([b for b in agg.iter_batches(batch_format="pyarrow")])
    day = t["day"].to_numpy()
    v = t["v"].to_numpy()
    lo, hi = int(day.min()), int(day.max())
    dense = np.zeros(hi - lo + 1, dtype=np.int64)
    dense[day - lo] = v
    return lo, dense


def _q_mann_kendall(sf_dir):
    """MANN-KENDALL TREND TEST statistic on the dense daily event-count
    series: S = Σ_{i<j} sign(n_j − n_i), with the tie-correction inputs
    (Σ t_g·(t_g−1) over tied-value groups) — all exact int64.  Dense
    counts come from one combiner-first day rollup; the quadratic pair
    sweep runs driver-side over DAYS (calendar-bounded), never rows."""
    lo, dense = _dense_daily(sf_dir)
    d = len(dense)
    # S via broadcast sign matrix over days (d is calendar-bounded)
    diff = np.sign(dense[None, :].astype(np.int64)
                   - dense[:, None].astype(np.int64))
    s = int(np.triu(diff, k=1).sum())
    _, counts = np.unique(dense, return_counts=True)
    ties = int((counts * (counts - 1)).sum())
    return pa.table({"n_days": pa.array([d], type=pa.int64()),
                     "s_stat": pa.array([s], type=pa.int64()),
                     "tie_pairs2": pa.array([ties], type=pa.int64())})


def _q_cusum_changepoint(sf_dir):
    """CUSUM CHANGE-POINT detection on the dense daily revenue series:
    the split t* maximizing |n·S_t − t·S_n| (the scaled deviation of the
    prefix sum from the global linear trend) — EXACT integers end to
    end, earliest-day tie-break; output (day, dev).  Same plan shape as
    mann_kendall: one day rollup, driver math over the bounded
    calendar."""
    lo, dense = _dense_daily(sf_dir, value="value")
    n = len(dense)
    if n < 2:  # single-day calendar: no split candidates (oracle: 0 rows)
        i64 = pa.array([], type=pa.int64())
        return pa.table({"split_day": i64, "dev": i64})
    s = np.cumsum(dense)  # S_t for prefix length t = 1..n
    t_arr = np.arange(1, n, dtype=np.int64)  # splits 1..n-1
    dev = np.abs(n * s[:-1] - t_arr * int(s[-1]))
    k = int(np.argmax(dev))  # argmax takes the FIRST max: earliest day
    return pa.table({
        "split_day": pa.array([lo + k], type=pa.int64()),
        "dev": pa.array([int(dev[k])], type=pa.int64())})


_KCORE_ROUNDS = 8
_KCORE_K = 3


def _q_k_core(sf_dir):
    """K-CORE PEELING (bounded rounds): nodes surviving 8 rounds of
    degree-≥3 filtering on the derived undirected graph, with their
    degrees in the surviving edge set.  The node space is DOMAIN-BOUNDED
    (≤397 ids by construction — same contract as dbscan_cells' lattice),
    so after ONE combiner-first distinct-edge aggregate the peeling runs
    driver-side over ≤78k edges at any event volume; the round count is
    FIXED so the SQL oracle unrolls the identical 8 filters (unbounded
    fixpoint peeling belongs to the BSP family, cf. cc_iterative).
    The graph derives from the FIXED event_id ≤ 1000 slice (predicate
    pushed into the parquet scan) so its density — hence the peeling
    cascade: 225 → 99 nodes over the 8 rounds — is scale-invariant; an
    unfiltered arithmetic graph saturates the bounded node space at
    higher volumes and the degree filter never bites."""
    import ray.data

    from engine.rayds.shuffle import grouped_agg

    import pyarrow.dataset as pds
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id"],
                               filter=pds.field("event_id") <= 1000)

    def edges(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy()
        x = eid % np.int64(397)
        y = (eid // np.int64(397) + eid % np.int64(389)) % np.int64(397)
        m = x != y
        a = np.minimum(x[m], y[m])
        b = np.maximum(x[m], y[m])
        return pa.table({"a": pa.array(a), "b": pa.array(b)})

    e = grouped_agg(
        ds.map_batches(edges, batch_format="pyarrow", batch_size=None,
                       zero_copy_batch=True),
        ["a", "b"], [("a", "count")], ["_n"], plan="tree",
        empty_schema=pa.schema([("a", pa.int64()), ("b", pa.int64()),
                                ("_n", pa.int64())]))
    blocks = [x for x in e.iter_batches(batch_format="pyarrow")
              if x.num_columns > 0]
    if blocks:
        t = pa.concat_tables(blocks)
        a = t["a"].to_numpy().copy()
        b = t["b"].to_numpy().copy()
    else:  # a legitimately EMPTY derived graph (degenerate id range)
        a = np.empty(0, dtype=np.int64)
        b = np.empty(0, dtype=np.int64)
    for _ in range(_KCORE_ROUNDS):
        deg = np.bincount(a, minlength=397) + np.bincount(b, minlength=397)
        keep_node = deg >= _KCORE_K
        m = keep_node[a] & keep_node[b]
        a, b = a[m], b[m]
    deg = np.bincount(a, minlength=397) + np.bincount(b, minlength=397)
    nodes = np.nonzero(deg)[0].astype(np.int64)
    return pa.table({"node": pa.array(nodes),
                     "deg": pa.array(deg[nodes].astype(np.int64))})


def _q_ewma_value(sf_dir):
    """EXPONENTIALLY-WEIGHTED moving value per user (the smoothing
    variant completing the window-frame family: ROWS-k = rolling_value,
    RANGE-time = time_window, unbounded = user_running_total): trailing
    10-row frame with DYADIC weights 2^(9−lag), so the weighted sum and
    weight total stay EXACT int64 and the float ewma is one division —
    bit-identical to the SQL shifted-join oracle.  One hash exchange on
    user_id (engine/ops/window.py::ewma_sum)."""
    import ray.data

    from engine.ops.window import ewma_sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "value"])

    def project(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch["user_id"],
            "ts_us": batch["ts"].cast(pa.int64()),
            "event_id": batch["event_id"],
            "cents": pa.array(
                np.floor(batch["value"].to_numpy() * 100.0)
                .astype(np.int64))})

    proj = ds.map_batches(project, batch_format="pyarrow", batch_size=None,
                          zero_copy_batch=True)
    return ewma_sum(proj, "user_id", ["ts_us", "event_id"], "cents",
                    span=10, id_col="event_id")


def _q_rfm_segments(sf_dir):
    """RFM SEGMENTATION (the marketing-analytics composite): per-user
    Recency/Frequency/Monetary quintiles with SQL ntile(5) semantics
    (remainder buckets first, ties broken by user_id), rolled up to the
    ≤125 segment cells with user counts and monetary sums.

    Scale shape: ONE hash exchange builds per-user metrics; each
    metric's ntile needs every user's GLOBAL POSITION, which runs as a
    Ray-native range sort of the (metric·2²⁰ + user_id) composite (the
    unique-key total order) + the two-phase prefix scan — 3 ints per
    block to the driver, no extra all-to-all (the shuffle_positions
    machinery); buckets then attach through two adaptive equi-joins and
    a combiner-first rollup.  The 2²⁰ composite bound on user_id is the
    documented assumption (rank-encode ids past that)."""
    import ray.data

    from engine.ops.scan import ordered_cumsum
    from engine.rayds.shuffle import equi_join, grouped_agg

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts", "value"])

    def proj(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t["user_id"],
            "ts_us": t["ts"].cast(pa.int64()),
            "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            "cents": pa.array(
                np.floor(t["value"].to_numpy() * 100.0).astype(np.int64))})

    per = grouped_agg(
        ds.map_batches(proj, batch_format="pyarrow", batch_size=None,
                       zero_copy_batch=True),
        ["user_id"],
        [("ts_us", "max"), ("one", "sum"), ("cents", "sum")],
        ["last_ts", "freq", "mon"]).materialize()
    n_users = per.count()

    # DRIVER-NTILE fast path: the per-user table is vocabulary-sized
    # (one row per user); within the broadcast budget the three ntiles
    # + segment rollup are three np.lexsorts on the driver — the
    # sort-based plan below (3 Ray range sorts + 3 equi-joins) remains
    # for user counts past the budget.
    if n_users <= 5_000_000:
        t = pa.concat_tables(
            [b for b in per.iter_batches(batch_format="pyarrow")]
        ) if n_users else pa.table(
            {"user_id": pa.array([], type=pa.int64()),
             "last_ts": pa.array([], type=pa.int64()),
             "freq": pa.array([], type=pa.int64()),
             "mon": pa.array([], type=pa.int64())})
        uid = t["user_id"].to_numpy()
        last_ts = t["last_ts"].to_numpy()
        freq = t["freq"].to_numpy()
        mon = t["mon"].to_numpy()
        gday = int(last_ts.max()) // 86_400_000_000 if n_users else 0
        q, r = divmod(int(n_users), 5)

        def ntile(metric: np.ndarray) -> np.ndarray:
            order = np.lexsort((uid, metric))
            pos0 = np.empty(len(metric), dtype=np.int64)
            pos0[order] = np.arange(len(metric), dtype=np.int64)
            head = r * (q + 1)
            return np.where(pos0 < head, pos0 // (q + 1),
                            r + (pos0 - head) // max(q, 1)) + 1

        r_q = ntile(gday - last_ts // 86_400_000_000)
        f_q = ntile(freq)
        m_q = ntile(mon)
        key = (r_q * 6 + f_q) * 6 + m_q  # buckets are 1..5 → base 6
        order = np.argsort(key, kind="stable")
        ks = key[order]
        newk = np.r_[True, ks[1:] != ks[:-1]] if len(ks) else np.empty(0, bool)
        s = np.flatnonzero(newk)
        ku = ks[s]
        cnt = np.diff(np.append(s, len(ks)))
        msum = np.add.reduceat(mon[order], s) if len(ks) else             np.empty(0, np.int64)
        return pa.table({
            "r_q": pa.array(ku // 36),
            "f_q": pa.array((ku // 6) % 6),
            "m_q": pa.array(ku % 6),
            "n_users": pa.array(cnt.astype(np.int64)),
            "sum_cents": pa.array(msum.astype(np.int64)),
        })

    from engine.rayds.shuffle import dataset_minmax
    gday = int(dataset_minmax(per, ["last_ts"])["last_ts"][1]) \
        // 86_400_000_000

    q, r = divmod(n_users, 5)

    def pos_to_bucket(pos0: np.ndarray) -> np.ndarray:
        # SQL ntile(5): remainder buckets (size q+1) come first
        head = r * (q + 1)
        return np.where(pos0 < head, pos0 // (q + 1),
                        r + (pos0 - head) // max(q, 1)) + 1

    def metric_buckets(metric_fn, out_name):
        def key_fn(t: pa.Table) -> pa.Table:
            m = metric_fn(t)
            uid = t["user_id"].to_numpy()
            return pa.table({
                "k": pa.array(m * (1 << 20) + uid),
                "user_id": t["user_id"],
                "one": pa.array(np.ones(t.num_rows, dtype=np.int64))})

        keyed = per.map_batches(key_fn, batch_format="pyarrow",
                                batch_size=None, zero_copy_batch=True)
        pos = ordered_cumsum(keyed.sort("k").materialize(), "k", "one",
                             out_col="cum0")

        def bucket(t: pa.Table) -> pa.Table:
            return pa.table({
                "user_id": t["user_id"],
                out_name: pa.array(pos_to_bucket(t["cum0"].to_numpy()))})

        return pos.map_batches(bucket, batch_format="pyarrow",
                               batch_size=None, zero_copy_batch=True)

    rb = metric_buckets(
        lambda t: gday - t["last_ts"].to_numpy() // 86_400_000_000, "r_q")
    fb = metric_buckets(lambda t: t["freq"].to_numpy(), "f_q")
    mb = metric_buckets(lambda t: t["mon"].to_numpy(), "m_q")

    def attach_mon(t: pa.Table) -> pa.Table:
        return pa.table({"user_id": t["user_id"], "mon": t["mon"]})

    mon = per.map_batches(attach_mon, batch_format="pyarrow",
                          batch_size=None, zero_copy_batch=True)
    j = equi_join(rb, fb, "user_id", "user_id", ["r_q"], ["f_q"])
    j = equi_join(j, mb, "_k", "user_id", ["r_q", "f_q"], ["m_q"])
    j = equi_join(j, mon, "_k", "user_id", ["r_q", "f_q", "m_q"], ["mon"])
    out = grouped_agg(j, ["r_q", "f_q", "m_q"],
                      [("r_q", "count"), ("mon", "sum")],
                      ["n_users", "sum_cents"], plan="tree")
    return out


def _q_acf_table(sf_dir):
    """AUTOCORRELATION FUNCTION table (lags 1..14) of the dense daily
    event-count series — generalizes daily_autocorr's single lag to the
    full ACF screen.  One combiner-first day rollup; per-lag exact
    integer moments + pearson_from_moments' fixed float expression run
    driver-side over the CALENDAR-BOUNDED series (never rows), mirrored
    term-for-term by the SQL lag-join oracle."""
    from engine.ops.stats import pearson_from_moments

    lo, dense = _dense_daily(sf_dir)
    lags, acfs = [], []
    for k in range(1, 15):
        if k >= len(dense):
            break
        x = dense[:-k].astype(object)
        y = dense[k:].astype(object)
        m = {"n": len(x), "sx": int(sum(x)), "sy": int(sum(y)),
             "sxx": int(sum(x * x)), "syy": int(sum(y * y)),
             "sxy": int(sum(x * y))}
        lags.append(k)
        acfs.append(pearson_from_moments(m))
    return pa.table({"lag": pa.array(lags, type=pa.int64()),
                     "acf": pa.array(acfs, type=pa.float64())})


def _q_theil_sen(sf_dir):
    """THEIL-SEN ROBUST TREND: the median of all pairwise slopes
    (v_j − v_i)/(j − i) of the dense daily count series.  Slopes are
    evaluated as DOUBLES in the oracle's exact expression (one division
    of exact ints per pair — identical rounding both sides), and the
    median interpolation mirrors SQL median() ((lo + hi)/2 on even
    counts).  Pair sweep is driver-side over the calendar-bounded
    series."""
    lo, dense = _dense_daily(sf_dir)
    d = len(dense)
    i, j = np.triu_indices(d, k=1)
    slopes = np.sort((dense[j] - dense[i]).astype(np.float64)
                     / (j - i).astype(np.float64))
    m = len(slopes)
    if m == 0:  # single-day calendar — SQL median over 0 rows is NULL
        return pa.table({"n_pairs": pa.array([0], type=pa.int64()),
                         "slope": pa.array([None], type=pa.float64())})
    med = (slopes[m // 2] if m % 2 else
           (slopes[m // 2 - 1] + slopes[m // 2]) / 2.0)
    return pa.table({"n_pairs": pa.array([m], type=pa.int64()),
                     "slope": pa.array([float(med)], type=pa.float64())})


def _q_value_shape_stats(sf_dir):
    """GROUPED SKEWNESS/KURTOSIS (distribution-shape screen): per
    event_type population g1 = M3/M2^1.5 and g2 = M4/M2² − 3 where
    M2/M3/M4 are the n-scaled central moments from EXACT integer power
    sums (n·Σx²−S², n²Σx³−3nSΣx²+2S³, n³Σx⁴−4n²SΣx³+6nS²Σx²−3S⁴ — the
    n-powers cancel so no float normalization is needed).  Per-block
    per-type power sums come from the vectorized 16-bit-limb kernel
    (stats.exact_power_sums — Σc⁴ overflows int64, so limb products
    accumulate separately and recombine as Python ints), serialized as
    decimal strings through the tree fold; the final floats are one
    fixed expression mirrored by the HUGEINT oracle."""
    import ray.data

    from engine.ops.stats import exact_power_sums
    from engine.rayds.shuffle import tree_fold_refs

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        et = t["event_type"].to_numpy(zero_copy_only=False)
        c = np.floor(t["value"].to_numpy() * 100.0).astype(np.int64)
        types, code = np.unique(et, return_inverse=True)
        rows = {"event_type": [], "n": [], "s1": [], "s2": [], "s3": [],
                "s4": []}
        for ti, tname in enumerate(types):  # loop over TYPES (bounded)
            v = c[code == ti]
            s1, s2, s3, s4 = exact_power_sums(v)
            rows["event_type"].append(str(tname))
            rows["n"].append(len(v))
            rows["s1"].append(str(s1))
            rows["s2"].append(str(s2))
            rows["s3"].append(str(s3))
            rows["s4"].append(str(s4))
        return pa.table({
            "event_type": pa.array(rows["event_type"], type=pa.string()),
            "n": pa.array(rows["n"], type=pa.int64()),
            "s1": pa.array(rows["s1"], type=pa.string()),
            "s2": pa.array(rows["s2"], type=pa.string()),
            "s3": pa.array(rows["s3"], type=pa.string()),
            "s4": pa.array(rows["s4"], type=pa.string())})

    def combine(tbls: list[pa.Table]) -> pa.Table:
        t = pa.concat_tables(tbls).combine_chunks()
        acc: dict[str, list] = {}
        for i in range(t.num_rows):
            key = t["event_type"][i].as_py()
            r = acc.setdefault(key, [0, 0, 0, 0, 0])
            r[0] += t["n"][i].as_py()
            for j, col in enumerate(("s1", "s2", "s3", "s4"), start=1):
                r[j] += int(t[col][i].as_py())
        keys = sorted(acc)
        return pa.table({
            "event_type": pa.array(keys, type=pa.string()),
            "n": pa.array([acc[k][0] for k in keys], type=pa.int64()),
            **{c: pa.array([str(acc[k][j]) for k in keys],
                           type=pa.string())
               for j, c in enumerate(("s1", "s2", "s3", "s4"), start=1)}})

    part = ds.map_batches(partial, batch_format="pyarrow", batch_size=None,
                          zero_copy_batch=True)
    t = tree_fold_refs(part, combine)
    out = {"event_type": [], "n": [], "skew": [], "kurtosis": []}
    for i in range(t.num_rows):
        n = t["n"][i].as_py()
        s1, s2, s3, s4 = (int(t[c][i].as_py())
                          for c in ("s1", "s2", "s3", "s4"))
        m2 = n * s2 - s1 * s1
        m3 = n * n * s3 - 3 * n * s1 * s2 + 2 * s1 ** 3
        m4 = (n ** 3 * s4 - 4 * n * n * s1 * s3
              + 6 * n * s1 * s1 * s2 - 3 * s1 ** 4)
        out["event_type"].append(t["event_type"][i].as_py())
        out["n"].append(n)
        fm2 = float(m2)
        if fm2 == 0.0:  # constant/singleton group — DuckDB x/0.0 is NULL
            out["skew"].append(None)
            out["kurtosis"].append(None)
        else:
            out["skew"].append(float(m3) / (fm2 * math.sqrt(fm2)))
            out["kurtosis"].append(float(m4) / (fm2 * fm2) - 3.0)
    return pa.table({
        "event_type": pa.array(out["event_type"], type=pa.string()),
        "n": pa.array(out["n"], type=pa.int64()),
        "skew": pa.array(out["skew"], type=pa.float64()),
        "kurtosis": pa.array(out["kurtosis"], type=pa.float64())})


def _q_benford_digits(sf_dir):
    """BENFORD FIRST-DIGIT profile (fraud/quality screen): counts of
    the leading decimal digit of positive integer cents — the digit is
    extracted with pyarrow's C string kernels (cast → slice → cast; no
    float log10, whose boundary rounding at powers of ten would
    misclassify), then a 9-cell combiner-first count."""
    import ray.data

    from engine.rayds.shuffle import grouped_agg

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["value"])

    def digit(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        c = np.floor(t["value"].to_numpy() * 100.0).astype(np.int64)
        c = c[c > 0]
        s = pc.cast(pa.array(c), pa.string())
        d = pc.cast(pc.utf8_slice_codeunits(s, 0, 1), pa.int64())
        return pa.table({"digit": d,
                         "one": pa.array(np.ones(len(c), dtype=np.int64))})

    return grouped_agg(
        ds.map_batches(digit, batch_format="pyarrow", batch_size=None,
                       zero_copy_batch=True),
        ["digit"], [("one", "sum")], ["n"], plan="tree")


def _q_q10_returned(sf_dir):
    """TPC-H Q10 SHAPE (returned-item revenue, top-20 customers): the
    big-big orderkey join between the date-windowed orders slice and
    the returnflag='R' lineitem slice rides the adaptive equi-join,
    revenue rolls up combiner-first on custkey (cardinality grows with
    the data → shuffle plan), the exact top-20 is a block combiner +
    tree fold (no second all-to-all), and c_name attaches to the
    20-row result through the broadcast side of the adaptive join.
    Revenue is exact int64 basis points: price_cents · (100 − disc)."""
    import pyarrow.compute as pc
    import ray.data

    from engine.rayds.shuffle import equi_join, grouped_agg, tree_fold_refs

    lo = np.datetime64("1996-07-01T00:00:00", "us").astype(np.int64)
    hi = np.datetime64("1996-10-01T00:00:00", "us").astype(np.int64)

    def owin(t: pa.Table) -> pa.Table:
        d = t["o_orderdate"].cast(pa.int64())
        m = pc.and_(pc.greater_equal(d, lo), pc.less(d, hi))
        return t.filter(m).select(["o_orderkey", "o_custkey"])

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    ).map_batches(owin, batch_format="pyarrow", batch_size=None,
                  zero_copy_batch=True)

    def li_r(t: pa.Table) -> pa.Table:
        f = t.filter(pc.equal(t["l_returnflag"], "R"))
        cents = np.rint(f["l_extendedprice"].to_numpy() * 100.0).astype(
            np.int64)
        d100 = np.rint(f["l_discount"].to_numpy() * 100.0).astype(np.int64)
        return pa.table({"l_orderkey": f["l_orderkey"],
                         "rev_bp": pa.array(cents * (100 - d100))})

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_returnflag", "l_extendedprice",
                 "l_discount"],
    ).map_batches(li_r, batch_format="pyarrow", batch_size=None,
                  zero_copy_batch=True)

    j = equi_join(li, orders, "l_orderkey", "o_orderkey",
                  ["rev_bp"], ["o_custkey"])
    rolled = grouped_agg(j, ["o_custkey"], [("rev_bp", "sum")],
                         ["revenue_bp"], plan="shuffle")

    def topk(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows <= 20:
            return batch
        rev = batch["revenue_bp"].to_numpy()
        key = batch["o_custkey"].to_numpy()
        order = np.lexsort((key, -rev))[:20]
        return batch.take(pa.array(order))

    top = tree_fold_refs(
        rolled.map_batches(topk, batch_format="pyarrow", batch_size=None),
        lambda tbls: topk(pa.concat_tables(tbls).combine_chunks()))
    if top.num_columns == 0 or top.num_rows == 0:
        # an empty date window is legitimate on a sparse partition
        return pa.table({"c_custkey": pa.array([], type=pa.int64()),
                         "revenue_bp": pa.array([], type=pa.int64()),
                         "c_name": pa.array([], type=pa.string())})

    cust = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                 columns=["c_custkey", "c_name"])
    out = equi_join(top, cust, "o_custkey", "c_custkey",
                    ["revenue_bp"], ["c_name"])

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(["c_custkey", "revenue_bp", "c_name"])

    return out.map_batches(rename, batch_format="pyarrow", batch_size=None)


def _q_q15_top_supplier(sf_dir):
    """TPC-H Q15 SHAPE (top supplier(s) by windowed revenue — the view +
    scalar-max-subquery pattern): per-suppkey revenue rolls up
    combiner-first through the hash exchange (supplier cardinality
    grows with the data), the global max folds as a 1-int per-block
    partial, the ties-included filter streams, and s_name attaches via
    the adaptive join.  ALL suppliers achieving the max are returned
    (Q15 semantics)."""
    import pyarrow.compute as pc
    import ray.data

    from engine.rayds.shuffle import equi_join, grouped_agg, tree_fold_refs

    lo = np.datetime64("1996-01-01T00:00:00", "us").astype(np.int64)
    hi = np.datetime64("1996-04-01T00:00:00", "us").astype(np.int64)

    def li_fn(t: pa.Table) -> pa.Table:
        d = t["l_shipdate"].cast(pa.int64())
        f = t.filter(pc.and_(pc.greater_equal(d, lo), pc.less(d, hi)))
        cents = np.rint(f["l_extendedprice"].to_numpy() * 100.0).astype(
            np.int64)
        d100 = np.rint(f["l_discount"].to_numpy() * 100.0).astype(np.int64)
        return pa.table({"l_suppkey": f["l_suppkey"],
                         "rev_bp": pa.array(cents * (100 - d100))})

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_shipdate", "l_extendedprice",
                 "l_discount"],
    ).map_batches(li_fn, batch_format="pyarrow", batch_size=None,
                  zero_copy_batch=True)

    rolled = grouped_agg(li, ["l_suppkey"], [("rev_bp", "sum")],
                         ["total_bp"], plan="shuffle").materialize()

    def bmax(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"m": pa.array([], type=pa.int64())})
        return pa.table({"m": pa.array(
            [int(pc.max(t["total_bp"]).as_py())], type=pa.int64())})

    mt = tree_fold_refs(
        rolled.map_batches(bmax, batch_format="pyarrow", batch_size=None),
        lambda tbls: pa.concat_tables(tbls))
    if mt.num_columns == 0 or mt.num_rows == 0             or pc.max(mt["m"]).as_py() is None:
        # an empty ship-date window is legitimate on a sparse partition
        return pa.table({"s_suppkey": pa.array([], type=pa.int64()),
                         "total_bp": pa.array([], type=pa.int64()),
                         "s_name": pa.array([], type=pa.string())})
    best = int(pc.max(mt["m"]).as_py())

    top = rolled.map_batches(
        lambda t: t.filter(pc.equal(t["total_bp"], best)),
        batch_format="pyarrow", batch_size=None)
    supp = ray.data.read_parquet(f"{sf_dir}/supplier.parquet",
                                 columns=["s_suppkey", "s_name"])
    out = equi_join(top, supp, "l_suppkey", "s_suppkey",
                    ["total_bp"], ["s_name"])

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(["s_suppkey", "total_bp", "s_name"])

    return out.map_batches(rename, batch_format="pyarrow", batch_size=None)


def _q_q17_small_qty(sf_dir):
    """TPC-H Q17 SHAPE (small-quantity revenue vs a per-part scalar
    subquery): the brand slice of part joins lineitem adaptively, the
    (partkey → Σqty, n) rollup is combiner-first, and the qty <
    0.2·avg(qty) predicate is evaluated in EXACT integers —
    5·qty·n < Σqty (l_quantity is integral) — so no float average
    exists anywhere.  The brand slice joins TWICE (to roll up and to
    filter), so it is materialized once; the final (count, Σcents)
    folds as 2-int per-block partials."""
    import pyarrow.compute as pc
    import ray.data

    from engine.rayds.shuffle import equi_join, grouped_agg, tree_fold_refs

    def pfn(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["p_brand"], "Brand#11")).select(
            ["p_partkey"])

    brand = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"],
    ).map_batches(pfn, batch_format="pyarrow", batch_size=None,
                  zero_copy_batch=True)

    def li_fn(t: pa.Table) -> pa.Table:
        qty = np.rint(t["l_quantity"].to_numpy()).astype(np.int64)
        cents = np.rint(t["l_extendedprice"].to_numpy() * 100.0).astype(
            np.int64)
        return pa.table({"l_partkey": t["l_partkey"],
                         "qty": pa.array(qty), "cents": pa.array(cents),
                         "one": pa.array(np.ones(t.num_rows,
                                                 dtype=np.int64))})

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice"],
    ).map_batches(li_fn, batch_format="pyarrow", batch_size=None,
                  zero_copy_batch=True)

    j = equi_join(li, brand, "l_partkey", "p_partkey",
                  ["qty", "cents", "one"], []).materialize()
    stats = grouped_agg(j, ["_k"], [("qty", "sum"), ("one", "sum")],
                        ["sq", "n"], plan="shuffle")
    jj = equi_join(j, stats, "_k", "_k", ["qty", "cents"], ["sq", "n"])

    def small(t: pa.Table) -> pa.Table:
        qty = t["qty"].to_numpy()
        keep = 5 * qty * t["n"].to_numpy() < t["sq"].to_numpy()
        cents = t["cents"].to_numpy()[keep]
        return pa.table({
            "n_items": pa.array([int(keep.sum())], type=pa.int64()),
            "sum_cents": pa.array([int(cents.sum())], type=pa.int64())})

    t = tree_fold_refs(
        jj.map_batches(small, batch_format="pyarrow", batch_size=None),
        lambda tbls: pa.concat_tables(tbls))
    if t.num_columns == 0:  # legitimately empty join at tiny scale
        return pa.table({"n_items": pa.array([0], type=pa.int64()),
                         "sum_cents": pa.array([0], type=pa.int64())})
    return pa.table({
        "n_items": pa.array([int(pc.sum(t["n_items"]).as_py())],
                            type=pa.int64()),
        "sum_cents": pa.array([int(pc.sum(t["sum_cents"]).as_py())],
                              type=pa.int64())})


def _q_q19_disjunct(sf_dir):
    """TPC-H Q19 SHAPE (disjunction-of-conjunctions join predicate):
    part pre-filters to the three brands AT THE READ side, joins
    lineitem adaptively on partkey, and the OR-of-AND predicate
    evaluates as one vectorized boolean expression; revenue folds as
    2-int per-block partials — no all-to-all anywhere."""
    import pyarrow.compute as pc
    import ray.data

    from engine.rayds.shuffle import equi_join, tree_fold_refs

    BRANDS = ("Brand#12", "Brand#23", "Brand#34")

    def pfn(t: pa.Table) -> pa.Table:
        m = pc.is_in(t["p_brand"], value_set=pa.array(BRANDS))
        return t.filter(m).select(["p_partkey", "p_brand", "p_size"])

    parts = ray.data.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_brand", "p_size"],
    ).map_batches(pfn, batch_format="pyarrow", batch_size=None,
                  zero_copy_batch=True)

    def li_fn(t: pa.Table) -> pa.Table:
        qty = np.rint(t["l_quantity"].to_numpy()).astype(np.int64)
        cents = np.rint(t["l_extendedprice"].to_numpy() * 100.0).astype(
            np.int64)
        d100 = np.rint(t["l_discount"].to_numpy() * 100.0).astype(np.int64)
        return pa.table({"l_partkey": t["l_partkey"], "qty": pa.array(qty),
                         "rev_bp": pa.array(cents * (100 - d100))})

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice",
                 "l_discount"],
    ).map_batches(li_fn, batch_format="pyarrow", batch_size=None,
                  zero_copy_batch=True)

    j = equi_join(li, parts, "l_partkey", "p_partkey",
                  ["qty", "rev_bp"], ["p_brand", "p_size"])

    def pred(t: pa.Table) -> pa.Table:
        qty = t["qty"].to_numpy()
        size = t["p_size"].to_numpy()
        brand = t["p_brand"].to_numpy(zero_copy_only=False)
        keep = (
            ((brand == BRANDS[0]) & (size >= 1) & (size <= 25)
             & (qty >= 1) & (qty <= 21))
            | ((brand == BRANDS[1]) & (size >= 1) & (size <= 30)
               & (qty >= 10) & (qty <= 30))
            | ((brand == BRANDS[2]) & (size >= 1) & (size <= 40)
               & (qty >= 20) & (qty <= 40)))
        rev = t["rev_bp"].to_numpy()[keep]
        return pa.table({
            "n_items": pa.array([int(keep.sum())], type=pa.int64()),
            "revenue_bp": pa.array([int(rev.sum())], type=pa.int64())})

    t = tree_fold_refs(
        j.map_batches(pred, batch_format="pyarrow", batch_size=None),
        lambda tbls: pa.concat_tables(tbls))
    if t.num_columns == 0:  # legitimately empty join at tiny scale
        return pa.table({"n_items": pa.array([0], type=pa.int64()),
                         "revenue_bp": pa.array([0], type=pa.int64())})
    return pa.table({
        "n_items": pa.array([int(pc.sum(t["n_items"]).as_py())],
                            type=pa.int64()),
        "revenue_bp": pa.array([int(pc.sum(t["revenue_bp"]).as_py())],
                               type=pa.int64())})


def _q_prefix_dup_docs(sf_dir):
    """PREFIX DEDUP over documents: ids whose text is an exact duplicate
    of a lower-id doc or a strict prefix of another doc — the
    sorted-adjacency suffix-array trick (one Ray native range sort; a
    string is a prefix of any later string iff it is a prefix of its
    next-distinct successor).  See
    engine/ops/dedup.py::prefix_shadowed_ids for the boundary-stitch
    contract (≤3 boundary strings per block on the driver)."""
    import ray.data

    from engine.ops.dedup import prefix_shadowed_ids

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    return prefix_shadowed_ids(ds, "text", "doc_id")


def _q_minmax_scaled(sf_dir):
    """MIN-MAX FEATURE SCALING (the ML-prep normalizer): the global
    [min, max] folds as 2-double per-block partials (zero exchanges),
    broadcasts as plain Python floats into one streaming map, and every
    row scales as the single IEEE expression (v − mn) / (mx − mn) —
    bit-identical to the SQL oracle evaluating the same expression."""
    import pyarrow.compute as pc
    import ray.data

    from engine.rayds.shuffle import tree_fold_refs

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "value"])

    def mm(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"mn": pa.array([], type=pa.float64()),
                             "mx": pa.array([], type=pa.float64())})
        v = t["value"]
        return pa.table({
            "mn": pa.array([pc.min(v).as_py()], type=pa.float64()),
            "mx": pa.array([pc.max(v).as_py()], type=pa.float64())})

    t = tree_fold_refs(
        ds.map_batches(mm, batch_format="pyarrow", batch_size=None,
                       zero_copy_batch=True),
        lambda tbls: pa.concat_tables(tbls))
    mn = float(pc.min(t["mn"]).as_py())
    mx = float(pc.max(t["mx"]).as_py())
    span = mx - mn

    def scale(b: pa.Table) -> pa.Table:
        v = b["value"].to_numpy()
        return pa.table({"event_id": b["event_id"],
                         "scaled": pa.array((v - mn) / span)})

    return ds.map_batches(scale, batch_format="pyarrow", batch_size=None,
                          zero_copy_batch=True)


def _q_dim_stats(sf_dir):
    """PER-DIMENSION EMBEDDING STATS (feature-scaling / whitening
    prep): exact integer micro-unit moments per vector position, ZERO
    shuffles (the (dim, n, Σ, Σ²) partial matrix is |dims| rows per
    block regardless of corpus size), decimal128 tree fold, doubles
    computed in one fixed evaluation order mirrored by the oracle's
    lateral-unnest SQL.  See engine/ops/vecagg.py::vector_dim_stats."""
    import ray.data

    from engine.ops.vecagg import vector_dim_stats

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["embedding"])
    return vector_dim_stats(ds, "embedding")


def _q_degree_assortativity(sf_dir):
    """DEGREE ASSORTATIVITY of the part↔order bipartite graph: Pearson
    correlation between the part-degree and order-degree across the
    DISTINCT edge set (the graph-topology summary statistic).  Plan:
    distinct pairs + both degree rollups are combiner-first counts,
    degrees attach back through the adaptive equi-join, and the
    correlation rides the exact-integer decimal128 moment fold
    (engine/ops/stats.py::exact_corr) — bit-identical doubles."""
    import ray
    import ray.data

    from engine.ops.stats import exact_corr
    from engine.rayds.shuffle import hash_exchange_groups

    li = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_partkey", "l_orderkey"])

    # ONE order-keyed exchange dedupes edges AND attaches the order
    # degree (an order is complete within its partition); the part
    # degree then folds from per-partition partials that are DISJOINT
    # (each distinct edge lives in exactly one order partition) and
    # broadcasts — replaces the pairs/degp/dego shuffles + two
    # degree-attach equi-joins (each a ~1 s fixed-cost execution).
    def edges_dy(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_part"])
        if g.num_rows == 0:
            return pa.table({"part": pa.array([], type=pa.int64()),
                             "dy": pa.array([], type=pa.int64())})
        ok = g["l_orderkey"].to_numpy()
        pk = g["l_partkey"].to_numpy()
        order = np.lexsort((pk, ok))
        oks, pks = ok[order], pk[order]
        uniq = np.r_[True, (oks[1:] != oks[:-1]) | (pks[1:] != pks[:-1])]
        oks, pks = oks[uniq], pks[uniq]
        new = np.r_[True, oks[1:] != oks[:-1]]
        starts = np.flatnonzero(new)
        run = np.cumsum(new) - 1
        dy = np.diff(np.append(starts, len(oks)))[run]
        return pa.table({"part": pa.array(pks.astype(np.int64)),
                         "dy": pa.array(dy.astype(np.int64))})

    edges = hash_exchange_groups(li, ["l_orderkey"], edges_dy, 64)

    def degx_partial(t: pa.Table) -> pa.Table:
        parts, cnts = np.unique(t["part"].to_numpy(), return_counts=True)
        return pa.table({"part": pa.array(parts),
                         "cnt": pa.array(cnts.astype(np.int64))})

    # BUDGET-GUARDED driver fold (same pattern as _q_spearman_corr):
    # past the budget the part degree attaches through the retained
    # grouped_count + equi_join plan instead of an unbounded driver
    # materialization of vocabulary × partition partials.
    budget_ok = True
    tk, cn, tot = [], [], 0
    for b in edges.map_batches(degx_partial, batch_format="pyarrow",
                               batch_size=None).iter_batches(
            batch_format="pyarrow"):
        tk.append(b["part"].to_numpy())
        cn.append(b["cnt"].to_numpy())
        tot += len(b)
        if tot > _FOLD_BUDGET:
            budget_ok = False
            break
    if budget_ok:
        tka = np.concatenate(tk) if tk else np.empty(0, np.int64)
        cna = np.concatenate(cn) if cn else np.empty(0, np.int64)
        o = np.argsort(tka, kind="stable")
        tka, cna = tka[o], cna[o]
        s = np.flatnonzero(np.r_[True, tka[1:] != tka[:-1]]) \
            if len(tka) else np.empty(0, np.int64)
        dref = ray.put((tka[s],
                        np.add.reduceat(cna, s) if len(tka) else cna))

        def attach_dx(t: pa.Table) -> pa.Table:
            from engine.rayds.bcast import cached

            keys, vals = cached(dref)
            p = t["part"].to_numpy()
            return pa.table({"dx": pa.array(vals[np.searchsorted(keys,
                                                                 p)]),
                             "dy": t["dy"]})

        withdx = edges.map_batches(attach_dx, batch_format="pyarrow",
                                   batch_size=None)
        return exact_corr(withdx, "dx", "dy")
    # join plan: distinct pairs + both degree rollups as combiner-first
    # counts, degrees attach through the adaptive equi-join — every
    # stage distributed and bounded
    from engine.rayds.shuffle import equi_join, grouped_count

    pairs = grouped_count(li, ["l_partkey", "l_orderkey"],
                          out_col="_dup", use_shuffle="auto")
    degp = grouped_count(pairs.select_columns(["l_partkey"]),
                         ["l_partkey"], out_col="dx", use_shuffle="auto")
    dego = grouped_count(pairs.select_columns(["l_orderkey"]),
                         ["l_orderkey"], out_col="dy",
                         use_shuffle="auto")
    j1 = equi_join(pairs, degp, "l_partkey", "l_partkey",
                   ["l_orderkey"], ["dx"])
    j2 = equi_join(j1, dego, "l_orderkey", "l_orderkey", ["dx"], ["dy"])
    return exact_corr(j2, "dx", "dy")


def _q_user_record_high(sf_dir):
    """PER-USER RECORD-HIGH COUNT (running-max window screen): events
    whose value strictly exceeds every earlier value of the same user
    in (ts, event_id) order; the first event counts.  One hash
    exchange; the per-partition kernel is one composite-rank
    np.maximum.accumulate across ALL key runs (no per-user loop) —
    see engine/ops/window.py::record_high_counts."""
    import ray.data

    from engine.ops.window import record_high_counts

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts", "event_id",
                                        "value"])
    return record_high_counts(ds, "user_id", "ts", "event_id", "value")


def _q_sequence_ngrams(sf_dir):
    """EVENT-SEQUENCE TRIGRAM MINING (the n-gram generalization of
    markov_transitions' next-1): top-20 (e1,e2,e3) event-type trigrams
    over each user's (ts, event_id)-ordered stream, ties broken
    lexicographically.  One hash exchange on user_id; per partition a
    lexsort + shifted-array trigram emission (rows whose next two rows
    stay in the same key run) collapsed to ≤|types|³ count rows; the
    type-vocabulary-bounded partials tree-fold and the top-20 sorts on
    the driver."""
    import ray.data

    from engine.rayds.shuffle import grouped_agg, hash_exchange_groups

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts", "event_id",
                                        "event_type"])

    def part_fn(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_part"])
        n = g.num_rows
        empty = pa.table({"e1": pa.array([], type=pa.string()),
                          "e2": pa.array([], type=pa.string()),
                          "e3": pa.array([], type=pa.string()),
                          "one": pa.array([], type=pa.int64())})
        if n < 3:
            return empty
        u = g["user_id"].to_numpy(zero_copy_only=False)
        ts = g["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        et = g["event_type"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, u))
        u, et = u[order], et[order]
        ok = (u[:-2] == u[1:-1]) & (u[:-2] == u[2:])
        if not ok.any():
            return empty
        idx = np.flatnonzero(ok)
        t = pa.table({"e1": pa.array(et[idx]),
                      "e2": pa.array(et[idx + 1]),
                      "e3": pa.array(et[idx + 2]),
                      "one": pa.array(np.ones(len(idx), dtype=np.int64))})
        gb = t.group_by(["e1", "e2", "e3"]).aggregate([("one", "sum")])
        return gb.rename_columns(["e1", "e2", "e3", "one"])

    parts = hash_exchange_groups(ds, ["user_id"], part_fn)
    rolled = grouped_agg(parts, ["e1", "e2", "e3"], [("one", "sum")],
                         ["n"], plan="tree")

    def topk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        nn = t["n"].to_numpy()
        import pyarrow.compute as pc

        idx = pa.compute.sort_indices(
            t, sort_keys=[("n", "descending"), ("e1", "ascending"),
                          ("e2", "ascending"), ("e3", "ascending")])
        return t.take(idx[:20])

    return rolled.map_batches(topk, batch_format="pyarrow",
                              batch_size=None)


def _q_setsim_orders(sf_dir):
    """EXACT SET-SIMILARITY SELF-JOIN (AllPairs/PPJoin prefix
    filtering) over order baskets: all order pairs whose part sets
    have Jaccard ≥ 1/2, verified with exact integer arithmetic — the
    structured-record near-dup operator next to the text LSH families.
    See engine/ops/setsim.py for the prefix-filter dataflow (candidate
    generation only buckets on each basket's RAREST floor(c/2)+1
    tokens in global-frequency order)."""
    import ray.data

    from engine.ops.setsim import setsim_join
    from engine.rayds.shuffle import grouped_count

    li = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_orderkey", "l_partkey"])
    # raw multiset rows go straight in: the distinct folds into the
    # join's own exchanges (a separate distinct shuffle cost ~3 s)
    return setsim_join(li, "l_orderkey", "l_partkey", 1, 2)


def _q_boilerplate_ngrams(sf_dir):
    """BOILERPLATE / CONTAMINATION SCREEN: top-20 word 5-grams by
    cross-document spread (distinct docs DESC, occurrences DESC, gram
    ASC) — the repeated-template detector of LLM curation pipelines.
    Offset-arithmetic n-gram explode (engine/ops/text.py::
    ngram_explode, no row loops), per-(gram, doc) partial counts, one
    exchange on gram for the distinct-doc + occurrence rollup, block
    top-20 combiner + tree fold."""
    import ray.data

    from engine.rayds.shuffle import grouped_agg, grouped_count, \
        tree_fold_refs

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    from engine.ops.text import ngram_explode

    grams = docs.map_batches(
        lambda b: ngram_explode(b, 5), batch_format="pyarrow",
        batch_size=None, zero_copy_batch=True)
    per_doc = grouped_count(grams, ["gram", "doc_id"], out_col="nc",
                            use_shuffle=True)

    def ones(t: pa.Table) -> pa.Table:
        return pa.table({"gram": t["gram"], "nc": t["nc"],
                         "one": pa.array(np.ones(t.num_rows,
                                                 dtype=np.int64))})

    rolled = grouped_agg(
        per_doc.map_batches(ones, batch_format="pyarrow",
                            batch_size=None),
        ["gram"], [("one", "sum"), ("nc", "sum")], ["nd", "nc"],
        plan="shuffle")

    def topk(t: pa.Table) -> pa.Table:
        if t.num_rows <= 20:
            return t
        idx = pa.compute.sort_indices(
            t, sort_keys=[("nd", "descending"), ("nc", "descending"),
                          ("gram", "ascending")])
        return t.take(idx[:20])

    top = tree_fold_refs(
        rolled.map_batches(topk, batch_format="pyarrow",
                           batch_size=None),
        lambda tbls: topk(pa.concat_tables(tbls).combine_chunks()))
    return top


def _q_mkt_share(sf_dir):
    """TPC-H Q8 SHAPE (market share): the revenue share of
    supplier-nation NATION_2 per order-year, restricted to customers
    in region ASIA.

    BROADCAST plan (default): the asian custkey set, the windowed
    (orderkey → year) map and the (suppkey → nation) map each fold from
    ONE streaming pass under a budget guard and broadcast via ray.put;
    lineitem then streams ONCE with three searchsorted lookups and
    per-block 4-cell partials — zero exchanges.  Past any budget the
    original three-equi-join plan applies (_mkt_share_join_plan)."""
    try:
        return _mkt_share_broadcast_plan(sf_dir)
    except _MktShareOverflow:
        return _mkt_share_join_plan(sf_dir)


class _MktShareOverflow(Exception):
    pass


_MKT_BCAST_MAX = 5_000_000  # rows per broadcast map


def _collect_two(ds, c1, c2, budget=_MKT_BCAST_MAX):
    a, b, n = [], [], 0
    for t in ds.iter_batches(batch_format="pyarrow"):
        a.append(t[c1].to_numpy(zero_copy_only=False))
        b.append(t[c2].to_numpy(zero_copy_only=False) if c2 else None)
        n += len(t)
        if n > budget:
            raise _MktShareOverflow
    x = np.concatenate(a) if a else np.empty(0, np.int64)
    if not c2:
        return x, None
    ys = [v for v in b if v is not None]
    return x, (np.concatenate(ys) if ys else np.empty(0, np.int64))


def _mkt_share_broadcast_plan(sf_dir):
    import pyarrow.compute as pc
    import ray
    import ray.data

    from engine.rayds.shuffle import dim_table

    nat = dim_table(f"{sf_dir}/nation.parquet",
                    ["n_nationkey", "n_regionkey"])
    reg = dim_table(f"{sf_dir}/region.parquet",
                    ["r_regionkey", "r_name"])
    asia = int(reg.filter(pc.equal(reg["r_name"], "ASIA"))
               ["r_regionkey"][0].as_py())
    asia_nations = sorted(
        nat.filter(pc.equal(nat["n_regionkey"], asia))
        ["n_nationkey"].to_pylist())
    TARGET_NATION = 2
    lo = np.datetime64("1995-01-01T00:00:00", "us").astype(np.int64)
    hi = np.datetime64("1997-01-01T00:00:00", "us").astype(np.int64)

    cust = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                 columns=["c_custkey", "c_nationkey"])

    def cfil(t: pa.Table) -> pa.Table:
        keep = pc.is_in(t["c_nationkey"].cast(pa.int64()),
                        value_set=pa.array(asia_nations, type=pa.int64()))
        return t.filter(keep).select(["c_custkey"])

    ck, _ = _collect_two(cust.map_batches(
        cfil, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True), "c_custkey", None)
    ck = np.sort(ck.astype(np.int64))
    ckref = ray.put(ck)

    def owin(t: pa.Table) -> pa.Table:
        from engine.rayds.bcast import cached

        keys = cached(ckref)
        d = t["o_orderdate"].cast(pa.int64())
        f = t.filter(pc.and_(pc.greater_equal(d, lo), pc.less(d, hi)))
        okc = f["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(keys, okc)
        pos_c = np.minimum(pos, max(len(keys) - 1, 0))
        hit = (keys[pos_c] == okc) if len(keys) else np.zeros(len(okc), bool)
        f = f.filter(pa.array(hit))
        yr = (f["o_orderdate"].cast(pa.int64()).to_numpy(
            zero_copy_only=False).astype("datetime64[us]")
            .astype("datetime64[Y]").astype(np.int64) + 1970)
        return pa.table({"o_orderkey": f["o_orderkey"],
                         "o_year": pa.array(yr)})

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    ).map_batches(owin, batch_format="pyarrow", batch_size=None,
                  zero_copy_batch=True)
    ok, oy = _collect_two(orders, "o_orderkey", "o_year")
    oo = np.argsort(ok, kind="stable")
    ok, oy = ok[oo].astype(np.int64), oy[oo].astype(np.int64)

    supp = dim_table(f"{sf_dir}/supplier.parquet",
                     ["s_suppkey", "s_nationkey"])
    if supp.num_rows > _MKT_BCAST_MAX:
        raise _MktShareOverflow
    sk = supp["s_suppkey"].to_numpy().astype(np.int64)
    sn = supp["s_nationkey"].to_numpy().astype(np.int64)
    so = np.argsort(sk, kind="stable")
    sk, sn = sk[so], sn[so]
    mref = ray.put((ok, oy, sk, sn))

    def li_cells(t: pa.Table) -> pa.Table:
        from engine.rayds.bcast import cached

        ok_, oy_, sk_, sn_ = cached(mref)
        lok = t["l_orderkey"].to_numpy().astype(np.int64)
        pos = np.searchsorted(ok_, lok)
        pos_c = np.minimum(pos, max(len(ok_) - 1, 0))
        hit = (ok_[pos_c] == lok) if len(ok_) else np.zeros(len(lok), bool)
        if not hit.any():
            return pa.table({"o_year": pa.array([], type=pa.int64()),
                             "is_tgt": pa.array([], type=pa.int64()),
                             "rev_bp": pa.array([], type=pa.int64())})
        f = t.filter(pa.array(hit))
        yr = oy_[pos_c[hit]]
        lsk = f["l_suppkey"].to_numpy().astype(np.int64)
        natk = sn_[np.searchsorted(sk_, lsk)]
        cents = np.rint(f["l_extendedprice"].to_numpy() * 100.0).astype(
            np.int64)
        d100 = np.rint(f["l_discount"].to_numpy() * 100.0).astype(np.int64)
        rev = cents * (100 - d100)
        tgt = (natk == TARGET_NATION).astype(np.int64)
        key = yr * 2 + tgt
        ks = np.unique(key)
        sums = np.zeros(len(ks), dtype=np.int64)
        np.add.at(sums, np.searchsorted(ks, key), rev)
        return pa.table({"o_year": pa.array(ks // 2),
                         "is_tgt": pa.array(ks % 2),
                         "rev_bp": pa.array(sums)})

    partials = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                 "l_discount"],
    ).map_batches(li_cells, batch_format="pyarrow", batch_size=None,
                  zero_copy_batch=True)
    t = pa.concat_tables([b for b in partials.iter_batches(
        batch_format="pyarrow")] or
        [pa.table({"o_year": pa.array([], type=pa.int64()),
                   "is_tgt": pa.array([], type=pa.int64()),
                   "rev_bp": pa.array([], type=pa.int64())})])
    return _mkt_share_finish(t)


def _mkt_share_finish(t: pa.Table) -> pa.Table:
    yrs = t["o_year"].to_numpy()
    tgt = t["is_tgt"].to_numpy()
    rev = t["rev_bp"].to_numpy()
    out_y = np.unique(yrs)
    tot = np.zeros(len(out_y), dtype=np.int64)
    tg = np.zeros(len(out_y), dtype=np.int64)
    pos = np.searchsorted(out_y, yrs)
    np.add.at(tot, pos, rev)
    np.add.at(tg, pos, rev * tgt)
    share = np.array([float(a) / float(b) if b else float("nan")
                      for a, b in zip(tg, tot)])
    return pa.table({"o_year": pa.array(out_y),
                     "target_bp": pa.array(tg),
                     "total_bp": pa.array(tot),
                     "mkt_share": pa.array(share, type=pa.float64())})


def _mkt_share_join_plan(sf_dir):
    """The general three-equi-join plan (both sides past broadcast
    budgets): customer/supplier attaches via adaptive equi-join, the
    big-big orderkey join via the hash exchange, 4-cell rollup."""
    import pyarrow.compute as pc
    import ray.data

    from engine.rayds.shuffle import dim_table, equi_join, grouped_agg

    nat = dim_table(f"{sf_dir}/nation.parquet",
                    ["n_nationkey", "n_regionkey"])
    reg = dim_table(f"{sf_dir}/region.parquet",
                    ["r_regionkey", "r_name"])
    asia = int(reg.filter(pc.equal(reg["r_name"], "ASIA"))
               ["r_regionkey"][0].as_py())
    asia_nations = set(
        nat.filter(pc.equal(nat["n_regionkey"], asia))
        ["n_nationkey"].to_pylist())
    TARGET_NATION = 2  # NATION_2 (in ASIA)

    lo = np.datetime64("1995-01-01T00:00:00", "us").astype(np.int64)
    hi = np.datetime64("1997-01-01T00:00:00", "us").astype(np.int64)

    cust = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                 columns=["c_custkey", "c_nationkey"])

    def cfil(t: pa.Table) -> pa.Table:
        keep = pc.is_in(t["c_nationkey"].cast(pa.int64()),
                        value_set=pa.array(sorted(asia_nations),
                                           type=pa.int64()))
        return t.filter(keep).select(["c_custkey"])

    cust = cust.map_batches(cfil, batch_format="pyarrow",
                            batch_size=None, zero_copy_batch=True)

    def owin(t: pa.Table) -> pa.Table:
        d = t["o_orderdate"].cast(pa.int64())
        f = t.filter(pc.and_(pc.greater_equal(d, lo), pc.less(d, hi)))
        yr = (f["o_orderdate"].cast(pa.int64()).to_numpy(
            zero_copy_only=False).astype("datetime64[us]")
            .astype("datetime64[Y]").astype(np.int64) + 1970)
        return pa.table({"o_orderkey": f["o_orderkey"],
                         "o_custkey": f["o_custkey"],
                         "o_year": pa.array(yr)})

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    ).map_batches(owin, batch_format="pyarrow", batch_size=None,
                  zero_copy_batch=True)
    oc = equi_join(orders, cust, "o_custkey", "c_custkey",
                   ["o_orderkey", "o_year"], [])

    supp = ray.data.read_parquet(f"{sf_dir}/supplier.parquet",
                                 columns=["s_suppkey", "s_nationkey"])

    def li_fn(t: pa.Table) -> pa.Table:
        cents = np.rint(t["l_extendedprice"].to_numpy() * 100.0).astype(
            np.int64)
        d100 = np.rint(t["l_discount"].to_numpy() * 100.0).astype(
            np.int64)
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "l_suppkey": t["l_suppkey"],
                         "rev_bp": pa.array(cents * (100 - d100))})

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                 "l_discount"],
    ).map_batches(li_fn, batch_format="pyarrow", batch_size=None,
                  zero_copy_batch=True)
    ls = equi_join(li, supp, "l_suppkey", "s_suppkey",
                   ["l_orderkey", "rev_bp"], ["s_nationkey"])

    j = equi_join(ls, oc, "l_orderkey", "o_orderkey",
                  ["rev_bp", "s_nationkey"], ["o_year"])

    def cells(t: pa.Table) -> pa.Table:
        tgt = pc.equal(t["s_nationkey"].cast(pa.int64()),
                       TARGET_NATION).to_numpy(
            zero_copy_only=False).astype(np.int64)
        return pa.table({"o_year": t["o_year"],
                         "is_tgt": pa.array(tgt),
                         "rev_bp": t["rev_bp"]})

    rolled = grouped_agg(
        j.map_batches(cells, batch_format="pyarrow", batch_size=None),
        ["o_year", "is_tgt"], [("rev_bp", "sum")], ["rev_bp"],
        plan="tree",
        empty_schema=pa.schema([("o_year", pa.int64()),
                                ("is_tgt", pa.int64()),
                                ("rev_bp", pa.int64())]))
    t = pa.concat_tables([b for b in rolled.iter_batches(
        batch_format="pyarrow")] or
        [pa.table({"o_year": pa.array([], type=pa.int64()),
                   "is_tgt": pa.array([], type=pa.int64()),
                   "rev_bp": pa.array([], type=pa.int64())})])
    yrs = t["o_year"].to_numpy()
    tgt = t["is_tgt"].to_numpy()
    rev = t["rev_bp"].to_numpy()
    out_y = np.unique(yrs)
    tot = np.zeros(len(out_y), dtype=np.int64)
    tg = np.zeros(len(out_y), dtype=np.int64)
    pos = np.searchsorted(out_y, yrs)
    np.add.at(tot, pos, rev)
    np.add.at(tg, pos, rev * tgt)
    share = np.array([float(a) / float(b) if b else float("nan")
                      for a, b in zip(tg, tot)])
    return pa.table({"o_year": pa.array(out_y),
                     "target_bp": pa.array(tg),
                     "total_bp": pa.array(tot),
                     "mkt_share": pa.array(share, type=pa.float64())})


def _q_quantile_normalize(sf_dir):
    """QUANTILE NORMALIZATION (rank-to-uniform feature transform):
    every event's value maps to its exact cume_dist over the whole
    table — the rank.py scale shape (combiner-first distinct-cent
    counts → ONE range sort of the distinct table → two-phase prefix
    scan) builds the (cent, |{≤v}|) rank map, which joins back to the
    events through the adaptive equi-join; cdist is one float division
    of exact integers.  Values quantize to cents (documented; the SQL
    oracle applies the identical floor)."""
    import ray.data

    from engine.ops.rank import distinct_counts_ranked
    from engine.rayds.shuffle import equi_join

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "value"])

    def cents(t: pa.Table) -> pa.Table:
        c = np.floor(t["value"].to_numpy() * 100.0).astype(np.int64)
        return pa.table({"event_id": t["event_id"], "c": pa.array(c)})

    ev = ds.map_batches(cents, batch_format="pyarrow", batch_size=None,
                        zero_copy_batch=True).materialize()
    ranked = distinct_counts_ranked(ev.select_columns(["c"]), "c")

    def le_counts(t: pa.Table) -> pa.Table:
        return pa.table({"c": t["c"],
                         "le": pa.array(t["_cum0"].to_numpy()
                                        + t["cnt"].to_numpy())})

    rmap = ranked.map_batches(le_counts, batch_format="pyarrow",
                              batch_size=None)
    n = ev.count()
    j = equi_join(ev, rmap, "c", "c", ["event_id"], ["le"])

    def out(t: pa.Table) -> pa.Table:
        le = t["le"].to_numpy()
        return pa.table({"event_id": t["event_id"],
                         "cdist": pa.array(le / float(n))})

    return j.map_batches(out, batch_format="pyarrow", batch_size=None)


def _q_longest_streak(sf_dir):
    """GAPS-AND-ISLANDS: each user's longest run of consecutive equal
    event types in (ts, event_id) order.  One hash exchange on
    user_id; the per-partition kernel is one lexsort + run-boundary
    diff over (user, type) change points + a reduceat max per user —
    no row loops, the SQL mirror is the classic double-row_number
    grouping trick."""
    import ray.data

    from engine.rayds.shuffle import hash_exchange_groups

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts", "event_id",
                                        "event_type"])

    def part_fn(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_part"])
        n = g.num_rows
        if n == 0:
            return pa.table({"user_id": g["user_id"],
                             "longest": pa.array([], type=pa.int64())})
        u = g["user_id"].to_numpy()
        ts = g["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy()
        et = g["event_type"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, u))
        u, et = u[order], et[order]
        new_run = np.r_[True, (u[1:] != u[:-1]) | (et[1:] != et[:-1])]
        rstarts = np.flatnonzero(new_run)
        rlens = np.diff(np.append(rstarts, n))
        ru = u[rstarts]
        new_user = np.r_[True, ru[1:] != ru[:-1]]
        ustarts = np.flatnonzero(new_user)
        longest = np.maximum.reduceat(rlens, ustarts)
        return pa.table({"user_id": pa.array(ru[ustarts]),
                         "longest": pa.array(longest.astype(np.int64))})

    return hash_exchange_groups(ds, ["user_id"], part_fn)


def _q_table_checksums(sf_dir):
    """ORDER-INDEPENDENT TABLE CHECKSUMS (the replication / migration
    integrity op): per user-bucket, the XOR fold of each event's
    60-bit md5 fingerprint plus a row count — XOR is commutative, so
    any partitioning/arrival order produces the same checksum, and a
    single flipped row flips the bucket.  Zero exchanges: 16-row
    per-block partials tree-fold; md5 is the vectorized kernel
    (engine/ops/vhash.py), bit-equal to the SQL
    CAST(concat('0x', substr(md5(id),1,15)) AS BIGINT)."""
    import ray.data

    from engine.ops.vhash import md5_digest_words
    from engine.rayds.shuffle import tree_fold_refs

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "user_id"])
    B = 16

    def part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"bucket": pa.array([], type=pa.int64()),
                             "checksum": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64())})
        import pyarrow.compute as pc

        s = pc.cast(t["event_id"], pa.string())
        words = md5_digest_words(s)
        u = (words[:, 1].astype(np.uint64) << np.uint64(32)) | \
            words[:, 0].astype(np.uint64)
        fp = (u.byteswap() >> np.uint64(4)).view(np.int64)
        b = (t["user_id"].to_numpy() % B).astype(np.int64)
        order = np.argsort(b, kind="stable")
        b_s, fp_s = b[order], fp[order]
        starts = np.flatnonzero(np.r_[True, b_s[1:] != b_s[:-1]])
        xs = np.bitwise_xor.reduceat(fp_s, starts)
        cnt = np.diff(np.append(starts, len(b_s)))
        return pa.table({"bucket": pa.array(b_s[starts]),
                         "checksum": pa.array(xs),
                         "n": pa.array(cnt.astype(np.int64))})

    def fold(tbls: list[pa.Table]) -> pa.Table:
        t = pa.concat_tables(tbls).combine_chunks()
        if t.num_rows == 0:
            return tbls[0]
        b = t["bucket"].to_numpy()
        xs = t["checksum"].to_numpy()
        cnt = t["n"].to_numpy()
        order = np.argsort(b, kind="stable")
        b_s, xs_s, c_s = b[order], xs[order], cnt[order]
        starts = np.flatnonzero(np.r_[True, b_s[1:] != b_s[:-1]])
        return pa.table({
            "bucket": pa.array(b_s[starts]),
            "checksum": pa.array(np.bitwise_xor.reduceat(xs_s, starts)),
            "n": pa.array(np.add.reduceat(c_s, starts))})

    return tree_fold_refs(
        ds.map_batches(part, batch_format="pyarrow", batch_size=None,
                       zero_copy_batch=True), fold)


def _q_debounce_events(sf_dir):
    """DEBOUNCE / THROTTLE (streaming-hygiene dedup): drop an event if
    the same (user, type) fired within the previous 5 minutes —
    repeated-click suppression.  One hash exchange on user_id;
    per-partition lexsort by (user, type, ts, id) + one vectorized
    consecutive diff (run-start gating), exactly the SQL lag() mirror.
    Returns the kept event ids."""
    import ray.data

    from engine.rayds.shuffle import hash_exchange_groups

    GAP = 300_000_000  # 5 min in µs

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "event_type", "ts",
                                        "event_id"])

    def part_fn(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_part"])
        n = g.num_rows
        if n == 0:
            return pa.table({"event_id": pa.array([], type=pa.int64())})
        u = g["user_id"].to_numpy()
        et = g["event_type"].to_numpy(zero_copy_only=False)
        ts = g["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy()
        _, tcode = np.unique(et, return_inverse=True)
        order = np.lexsort((eid, ts, tcode, u))
        u_s, t_s, ts_s, eid_s = u[order], tcode[order], ts[order], \
            eid[order]
        new = np.r_[True, (u_s[1:] != u_s[:-1]) | (t_s[1:] != t_s[:-1])]
        gap = np.empty(n, dtype=np.int64)
        gap[0] = GAP + 1
        gap[1:] = ts_s[1:] - ts_s[:-1]
        keep = new | (gap > GAP)
        return pa.table({"event_id": pa.array(np.sort(eid_s[keep]))})

    return hash_exchange_groups(ds, ["user_id"], part_fn)


def _q_order_skyline(sf_dir):
    """SKYLINE (Pareto frontier) of orders maximizing (totalprice,
    orderdate): rows no other row weakly dominates with one strict
    coordinate.  Skylines compose — skyline(A ∪ B) =
    skyline(skyline(A) ∪ skyline(B)) — so each block reduces to its
    local frontier (lexsort + per-x-run max + running-max filter, all
    vectorized) and the tiny frontiers tree-fold; equal points are
    mutually non-dominating and all survive (mirrored by the oracle's
    NOT EXISTS).  Price compares in exact cents."""
    import ray.data

    from engine.rayds.shuffle import tree_fold_refs

    ds = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                               columns=["o_orderkey", "o_totalprice",
                                        "o_orderdate"])

    def conv(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": t["o_orderkey"],
            "price_cents": pa.array(
                np.rint(t["o_totalprice"].to_numpy() * 100.0)
                .astype(np.int64)),
            "date_us": t["o_orderdate"].cast(pa.int64())})

    def skyline(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return pa.table({
                "o_orderkey": pa.array([], type=pa.int64()),
                "price_cents": pa.array([], type=pa.int64()),
                "date_us": pa.array([], type=pa.int64())})
        x = t["price_cents"].to_numpy()
        y = t["date_us"].to_numpy()
        k = t["o_orderkey"].to_numpy()
        order = np.lexsort((-y, -x))
        x_s, y_s, k_s = x[order], y[order], k[order]
        new = np.r_[True, x_s[1:] != x_s[:-1]]
        run_id = np.cumsum(new) - 1
        run_top = y_s[np.flatnonzero(new)]        # max y of each x-run
        # running max of y over STRICTLY larger x (previous runs)
        prev = np.r_[np.int64(-2**62),
                     np.maximum.accumulate(run_top)[:-1]]
        keep = (y_s == run_top[run_id]) & (y_s > prev[run_id])
        return pa.table({"o_orderkey": pa.array(k_s[keep]),
                         "price_cents": pa.array(x_s[keep]),
                         "date_us": pa.array(y_s[keep])})

    def fold(tbls: list[pa.Table]) -> pa.Table:
        return skyline(pa.concat_tables(tbls).combine_chunks())

    def pre(t: pa.Table) -> pa.Table:
        return skyline(conv(t))

    folded = tree_fold_refs(
        ds.map_batches(pre, batch_format="pyarrow", batch_size=None,
                       zero_copy_batch=True),
        fold)
    return folded


def _q_brand_wavg_price(sf_dir):
    """QUANTITY-WEIGHTED AVERAGE price per brand: Σ(cents·qty)/Σqty as
    exact int64 partials (combiner-first through the adaptive join on
    partkey, brand rollup on the catalog-bounded key) and ONE float
    division — the weighted-aggregate family member next to the plain
    sums."""
    import ray.data

    from engine.rayds.shuffle import equi_join, grouped_agg

    part_t = ray.data.read_parquet(f"{sf_dir}/part.parquet",
                                   columns=["p_partkey", "p_brand"])

    def li_fn(t: pa.Table) -> pa.Table:
        qty = np.rint(t["l_quantity"].to_numpy()).astype(np.int64)
        cents = np.rint(t["l_extendedprice"].to_numpy() * 100.0).astype(
            np.int64)
        return pa.table({"l_partkey": t["l_partkey"],
                         "wsum": pa.array(cents * qty),
                         "qty": pa.array(qty)})

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice"],
    ).map_batches(li_fn, batch_format="pyarrow", batch_size=None,
                  zero_copy_batch=True)
    j = equi_join(li, part_t, "l_partkey", "p_partkey",
                  ["wsum", "qty"], ["p_brand"])
    rolled = grouped_agg(j, ["p_brand"], [("wsum", "sum"),
                                          ("qty", "sum")],
                         ["wsum", "qty"], plan="tree")

    def fin(t: pa.Table) -> pa.Table:
        w = t["wsum"].to_numpy()
        q = t["qty"].to_numpy()
        return pa.table({
            "p_brand": t["p_brand"],
            "sum_weighted_cents": pa.array(w),
            "sum_qty": pa.array(q),
            "wavg_cents": pa.array(w.astype(np.float64)
                                   / q.astype(np.float64))})

    return rolled.map_batches(fin, batch_format="pyarrow",
                              batch_size=None)


def _q_type_users_hll(sf_dir):
    """Per-event-type approximate distinct users (○ — grouped
    HyperLogLog): per-group 4 KiB register partials tree-fold with
    elementwise max, zero exchanges at any event volume.  Accuracy
    pinned by the ±6% pytest against the exact grouped distinct."""
    import ray.data

    from engine.ops.sketch import grouped_hll_distinct

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "user_id"])
    return grouped_hll_distinct(ds, "event_type", "user_id")


def _q_cell_adjacency(sf_dir):
    """SPATIAL ADJACENCY GRAPH of occupied grid cells: (cell_a,
    cell_b) pairs where cell_b is the right or down lattice neighbour
    of an occupied cell_a — the topology primitive under focal ops and
    region merging.  The occupied-cell table is lattice-bounded, so
    after the combiner-first count rollup ONE single-block vectorized
    searchsorted membership test emits the edges; the SQL oracle
    mirrors the cell-id arithmetic (right = +2^20, down = +1)."""
    from engine.rayds import pipeline, shuffle

    enc = pipeline.encoded_dataset(sf_dir).select_columns(["cell"])
    cells = shuffle.grouped_count(enc, ["cell"], out_col="n")

    def edges(t: pa.Table) -> pa.Table:
        c = np.sort(t["cell"].to_numpy())
        out_a, out_b = [], []
        for step in (1 << 20, 1):  # right, down
            nb = c + step
            pos = np.searchsorted(c, nb)
            ok = (pos < len(c)) & (c[np.minimum(pos, len(c) - 1)] == nb)
            out_a.append(c[ok])
            out_b.append(nb[ok])
        return pa.table({"cell_a": pa.array(np.concatenate(out_a)),
                         "cell_b": pa.array(np.concatenate(out_b))})

    return cells.map_batches(edges, batch_format="pyarrow",
                             batch_size=None)


def _q_hive_partition_roundtrip(sf_dir):
    """HIVE-PARTITIONED SINK + PARTITION-PRUNED SOURCE: events land
    once as parquet partitioned by event_type (Ray's partition_cols
    sink), then ONLY the purchase partition's directory is read back
    (directory-level pruning — no bytes of the other partitions move)
    into a per-user rollup.  The oracle aggregates the original table,
    so the check proves the partitioned roundtrip is lossless."""
    import shutil

    import ray.data

    from engine.rayds.shuffle import grouped_agg

    out = "/tmp/graft_hive_events"
    shutil.rmtree(out, ignore_errors=True)
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "user_id",
                                        "value"])

    def cents(t: pa.Table) -> pa.Table:
        c = np.rint(t["value"].to_numpy() * 100.0).astype(np.int64)
        return pa.table({"event_type": t["event_type"],
                         "user_id": t["user_id"],
                         "cents": pa.array(c)})

    ds.map_batches(cents, batch_format="pyarrow", batch_size=None,
                   zero_copy_batch=True).write_parquet(
        out, partition_cols=["event_type"])

    back = ray.data.read_parquet(f"{out}/event_type=purchase")

    def ones(t: pa.Table) -> pa.Table:
        return pa.table({"user_id": t["user_id"], "cents": t["cents"],
                         "one": pa.array(np.ones(t.num_rows,
                                                 dtype=np.int64))})

    return grouped_agg(
        back.map_batches(ones, batch_format="pyarrow", batch_size=None),
        ["user_id"], [("one", "sum"), ("cents", "sum")],
        ["n", "sum_cents"], plan="shuffle")


def _q_q12_linestatus(sf_dir):
    """TPC-H Q12 SHAPE (shipping-mode priority matrix, adapted to the
    columns this schema carries): per lineitem linestatus, how many
    joined orders are high-priority (1-URGENT / 2-HIGH) vs low — the
    join + conditional-aggregation pattern.  Orders project to a
    narrow (orderkey, is_high) stream, the big-big orderkey join rides
    the adaptive equi-join, and the 2×2 matrix is a combiner-first
    rollup folded as tree partials."""
    import pyarrow.compute as pc
    import ray.data

    from engine.rayds.shuffle import equi_join, grouped_agg

    def ofn(t: pa.Table) -> pa.Table:
        hi = pc.is_in(t["o_orderpriority"],
                      value_set=pa.array(["1-URGENT", "2-HIGH"]))
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "is_high": pc.cast(hi, pa.int64())})

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority"],
    ).map_batches(ofn, batch_format="pyarrow", batch_size=None,
                  zero_copy_batch=True)

    def lfn(t: pa.Table) -> pa.Table:
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "l_linestatus": t["l_linestatus"],
                         "one": pa.array(np.ones(t.num_rows,
                                                 dtype=np.int64))})

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linestatus"],
    ).map_batches(lfn, batch_format="pyarrow", batch_size=None,
                  zero_copy_batch=True)
    j = equi_join(li, orders, "l_orderkey", "o_orderkey",
                  ["l_linestatus", "one"], ["is_high"])

    def cells(t: pa.Table) -> pa.Table:
        hi = t["is_high"].to_numpy()
        return pa.table({"l_linestatus": t["l_linestatus"],
                         "high": pa.array(hi),
                         "low": pa.array(1 - hi)})

    return grouped_agg(
        j.map_batches(cells, batch_format="pyarrow", batch_size=None),
        ["l_linestatus"], [("high", "sum"), ("low", "sum")],
        ["high_count", "low_count"], plan="tree")


def _q_above_avg_orders(sf_dir):
    """CORRELATED SCALAR SUBQUERY, DECORRELATED (orders above the
    customer's own average): the per-customer (Σcents, n) rollup rides
    one hash exchange, joins back to the order stream adaptively, and
    the predicate price > avg evaluates EXACTLY in integers —
    cents·n > Σcents — so no float average exists anywhere.  Output:
    per customer, how many of their orders beat their mean."""
    import ray.data

    from engine.rayds.shuffle import equi_join, grouped_agg

    ds = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                               columns=["o_custkey", "o_totalprice"])

    def cents(t: pa.Table) -> pa.Table:
        c = np.rint(t["o_totalprice"].to_numpy() * 100.0).astype(
            np.int64)
        return pa.table({"o_custkey": t["o_custkey"],
                         "cents": pa.array(c),
                         "one": pa.array(np.ones(t.num_rows,
                                                 dtype=np.int64))})

    ev = ds.map_batches(cents, batch_format="pyarrow", batch_size=None,
                        zero_copy_batch=True).materialize()
    stats = grouped_agg(ev, ["o_custkey"], [("cents", "sum"),
                                            ("one", "sum")],
                        ["s", "n"], plan="shuffle")
    j = equi_join(ev, stats, "o_custkey", "o_custkey", ["cents"],
                  ["s", "n"])

    def flag(t: pa.Table) -> pa.Table:
        above = (t["cents"].to_numpy() * t["n"].to_numpy()
                 > t["s"].to_numpy()).astype(np.int64)
        return pa.table({"o_custkey": t["_k"],
                         "above": pa.array(above),
                         "one": pa.array(np.ones(t.num_rows,
                                                 dtype=np.int64))})

    return grouped_agg(
        j.map_batches(flag, batch_format="pyarrow", batch_size=None),
        ["o_custkey"], [("above", "sum"), ("one", "sum")],
        ["n_above_avg", "n_orders"], plan="shuffle")


def _q_dup_rate_by_source(sf_dir):
    """PER-SOURCE DUPLICATION PROFILE (which crawl/source is dirtiest
    — the curation triage view): per source, total docs vs distinct
    texts (by the 16-hex md5 fingerprint — byte-equal with the SQL
    substr(md5(text),1,16)).  Per-block (source, fp) dedup combiner →
    exact grouped distinct through one exchange; doc totals are a
    combiner-first count."""
    import ray.data

    from engine.ops.sketch import distinct_count_exact
    from engine.ops.vhash import md5_hex
    from engine.rayds.shuffle import equi_join, grouped_count

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["source", "text"])

    def fp(t: pa.Table) -> pa.Table:
        h = md5_hex(t["text"], prefix=16)
        return pa.table({"source": t["source"],
                         "fp": pa.array(h)})

    fps = ds.map_batches(fp, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True).materialize()
    nd = distinct_count_exact(fps, "source", "fp",
                              out_col="n_distinct")
    tot = grouped_count(fps.select_columns(["source"]), ["source"],
                        out_col="n_docs", use_shuffle=False)
    out = equi_join(tot, nd, "source", "source", ["n_docs"],
                    ["n_distinct"])

    def fin(t: pa.Table) -> pa.Table:
        t = t.rename_columns(["source", "n_docs", "n_distinct"])
        nd_ = t["n_distinct"].to_numpy()
        ndoc = t["n_docs"].to_numpy()
        return t.append_column(
            "n_dups", pa.array((ndoc - nd_).astype(np.int64)))

    return out.map_batches(fin, batch_format="pyarrow",
                           batch_size=None)


def _q_rolling_median(sf_dir):
    """ROLLING MEDIAN (the NON-DECOMPOSABLE window aggregate — unlike
    sum/mean it has no combiner form, which is exactly why it belongs
    in the suite): per user, median of the trailing 5-row frame in
    (ts, event_id) order.  One exchange; per partition the frame
    matrix is 5 shifted columns with run-start gating (+inf pads),
    one np.sort over axis 1, and the even-frame interpolation is
    (lo + hi)·0.5 — DuckDB's windowed-median evaluation (measured: it
    differs from quantile_cont's lo + (hi−lo)·frac by one rounding),
    so the doubles hash bit-identically."""
    import ray.data

    from engine.rayds.shuffle import hash_exchange_groups

    W = 5

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts", "event_id",
                                        "value"])

    def part_fn(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_part"])
        n = g.num_rows
        if n == 0:
            return pa.table({"event_id": g["event_id"],
                             "med": pa.array([], type=pa.float64())})
        u = g["user_id"].to_numpy()
        ts = g["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy()
        v = g["value"].to_numpy()
        order = np.lexsort((eid, ts, u))
        u_s, v_s, eid_s = u[order], v[order], eid[order]
        new = np.r_[True, u_s[1:] != u_s[:-1]]
        starts = np.flatnonzero(new)
        run_id = np.cumsum(new) - 1
        pos = np.arange(n, dtype=np.int64) - starts[run_id]
        frame = np.full((n, W), np.inf)
        for k in range(W):
            ok = pos >= k
            idx = np.flatnonzero(ok)
            frame[idx, k] = v_s[idx - k]
        frame.sort(axis=1)
        cnt = np.minimum(pos + 1, W)
        lo_i = (cnt - 1) // 2
        hi_i = cnt // 2
        rows = np.arange(n)
        lo = frame[rows, lo_i]
        hi = frame[rows, hi_i]
        med = (lo + hi) * 0.5   # DuckDB's windowed-median interpolation
        return pa.table({"event_id": pa.array(eid_s),
                         "med": pa.array(med)})

    return hash_exchange_groups(ds, ["user_id"], part_fn)


def _q_power_users_division(sf_dir):
    """RELATIONAL DIVISION (users who did EVERY event type): distinct
    (user, type) pair dedup doubles as the per-user distinct-type
    count; a user divides the 5-type relation iff the count equals the
    global type count (itself a tree-folded distinct — never
    hardcoded).  Two combiner-first exchanges, no joins."""
    import ray.data

    from engine.rayds.shuffle import grouped_count

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "event_type"])
    pairs = grouped_count(ds, ["user_id", "event_type"], out_col="_d",
                          use_shuffle="auto").materialize()
    ntypes = grouped_count(pairs.select_columns(["event_type"]),
                           ["event_type"], out_col="_t",
                           use_shuffle=False).count()
    per_user = grouped_count(pairs.select_columns(["user_id"]),
                             ["user_id"], out_col="n_types",
                             use_shuffle="auto")

    def full(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.equal(t["n_types"], ntypes)).select(
            ["user_id"])

    return per_user.map_batches(full, batch_format="pyarrow",
                                batch_size=None)


def _q_next_purchase(sf_dir):
    """FORWARD AS-OF JOIN (first purchase strictly after each click,
    same user — the backward as-of's mirror): one exchange on
    user_id; per partition both event streams ride ONE composite
    (user_rank·span + dt) int64 and a single side='right'
    searchsorted finds every click's next purchase — the
    followup_pairs/time_window composite shape.  Clicks with no later
    purchase report −1 (the SQL COALESCE mirror)."""
    import ray.data

    from engine.rayds.shuffle import hash_exchange_groups

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts", "event_id",
                                        "event_type"])

    def part_fn(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_part"])
        n = g.num_rows
        empty = pa.table({"event_id": pa.array([], type=pa.int64()),
                          "next_purchase_us": pa.array(
                              [], type=pa.int64())})
        if n == 0:
            return empty
        u = g["user_id"].to_numpy()
        ts = g["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy()
        et = g["event_type"].to_numpy(zero_copy_only=False)
        is_c = et == "click"
        is_p = et == "purchase"
        if not is_c.any():
            return empty
        t0 = ts.min()
        dt = ts - t0
        span = int(dt.max()) + 2
        _, urank = np.unique(u, return_inverse=True)
        comp = urank.astype(np.int64) * span + dt
        pc_ = np.sort(comp[is_p])
        p_ts = dt[is_p]
        porder = np.argsort(comp[is_p], kind="stable")
        p_ts_sorted = p_ts[porder]
        cq = comp[is_c]
        if len(pc_) == 0:
            # a partition whose users never purchase: every click −1
            return pa.table({
                "event_id": pa.array(eid[is_c]),
                "next_purchase_us": pa.array(
                    np.full(int(is_c.sum()), -1, dtype=np.int64))})
        pos = np.searchsorted(pc_, cq, side="right")
        # a hit only counts inside the SAME user's composite band
        cu = urank[is_c].astype(np.int64)
        ok = (pos < len(pc_)) & (pc_[np.minimum(pos, len(pc_) - 1)]
                                 // span == cu)
        out = np.full(int(is_c.sum()), -1, dtype=np.int64)
        out[ok] = p_ts_sorted[pos[ok]] + t0
        return pa.table({"event_id": pa.array(eid[is_c]),
                         "next_purchase_us": pa.array(out)})

    return hash_exchange_groups(ds, ["user_id"], part_fn)


def _q_value_drift(sf_dir):
    """DATA-DRIFT MONITOR (two-sample histogram comparison — the
    train-vs-prod distribution check): events split at the time
    midpoint into A/B, 20 fixed-width buckets over the exact global
    [min,max]; per bucket the exact counts (cA, cB) and the two-sample
    chi-square term ((cA·NB − cB·NA)² / (NA·NB·(cA+cB))) — emitted
    PER BUCKET so no cross-bucket float summation order exists; every
    numerator/denominator is an exact integer and the division is one
    float op.  Zero exchanges: 3-scalar bounds partials + 20-row count
    partials, both tree-folded."""
    import pyarrow.compute as pc
    import ray.data

    from engine.rayds.shuffle import tree_fold_refs

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "value"])

    def bounds(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"tmn": pa.array([], type=pa.int64()),
                             "tmx": pa.array([], type=pa.int64()),
                             "vmn": pa.array([], type=pa.float64()),
                             "vmx": pa.array([], type=pa.float64())})
        tsv = t["ts"].cast(pa.int64())
        return pa.table({
            "tmn": pa.array([pc.min(tsv).as_py()], type=pa.int64()),
            "tmx": pa.array([pc.max(tsv).as_py()], type=pa.int64()),
            "vmn": pa.array([pc.min(t["value"]).as_py()],
                            type=pa.float64()),
            "vmx": pa.array([pc.max(t["value"]).as_py()],
                            type=pa.float64())})

    bt = tree_fold_refs(
        ds.map_batches(bounds, batch_format="pyarrow", batch_size=None,
                       zero_copy_batch=True),
        lambda tbls: pa.concat_tables(tbls))
    tmn = int(pc.min(bt["tmn"]).as_py())
    tmx = int(pc.max(bt["tmx"]).as_py())
    vmn = float(pc.min(bt["vmn"]).as_py())
    vmx = float(pc.max(bt["vmx"]).as_py())
    mid = (tmn + tmx) // 2
    span = vmx - vmn
    B = 20

    def hist(t: pa.Table) -> pa.Table:
        tsv = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        v = t["value"].to_numpy()
        b = np.minimum((((v - vmn) / span) * B).astype(np.int64), B - 1)
        is_b = (tsv > mid).astype(np.int64)
        comp = b * 2 + is_b
        cnt = np.bincount(comp, minlength=2 * B).astype(np.int64)
        return pa.table({
            "bucket": pa.array(np.arange(B, dtype=np.int64)),
            "ca": pa.array(cnt[0::2]),
            "cb": pa.array(cnt[1::2])})

    ht = tree_fold_refs(
        ds.map_batches(hist, batch_format="pyarrow", batch_size=None,
                       zero_copy_batch=True),
        lambda tbls: pa.concat_tables(tbls)
        .group_by(["bucket"]).aggregate([("ca", "sum"), ("cb", "sum")])
        .rename_columns(["bucket", "ca", "cb"]))
    ca = ht["ca"].to_numpy()
    cb = ht["cb"].to_numpy()
    na = int(ca.sum())
    nb = int(cb.sum())
    num = (ca * nb - cb * na).astype(object)
    den = (na * nb) * (ca + cb).astype(object)
    term = np.array(
        [float(int(n_) * int(n_)) / float(d_) if d_ else 0.0
         for n_, d_ in zip(num, den)], dtype=np.float64)
    order = np.argsort(ht["bucket"].to_numpy())
    return pa.table({
        "bucket": pa.array(ht["bucket"].to_numpy()[order]),
        "count_a": pa.array(ca[order]),
        "count_b": pa.array(cb[order]),
        "chi2_term": pa.array(term[order], type=pa.float64())})


def _q_paa_symbols(sf_dir):
    """SAX-STYLE SYMBOLIZATION (PAA + fixed breakpoints — the
    time-series indexing transform): each user's (ts, event_id)-ordered
    value series splits into 8 equal-count segments (seg =
    ⌊i·8/n⌋), each segment's mean quantizes to a symbol by fixed
    thresholds — decided EXACTLY as the integer comparison
    Σcents vs T·100·n_seg (no float mean anywhere).  One exchange;
    per-partition lexsort + reduceat sums."""
    import ray.data

    from engine.rayds.shuffle import hash_exchange_groups

    S = 8
    THRESH = (25, 50, 75)  # dollar breakpoints → symbols 0..3

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts", "event_id",
                                        "value"])

    def part_fn(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_part"])
        n = g.num_rows
        if n == 0:
            return pa.table({"user_id": g["user_id"],
                             "seg": pa.array([], type=pa.int64()),
                             "symbol": pa.array([], type=pa.int64())})
        u = g["user_id"].to_numpy()
        ts = g["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy()
        cents = np.rint(g["value"].to_numpy() * 100.0).astype(np.int64)
        order = np.lexsort((eid, ts, u))
        u_s, c_s = u[order], cents[order]
        new = np.r_[True, u_s[1:] != u_s[:-1]]
        starts = np.flatnonzero(new)
        run_id = np.cumsum(new) - 1
        nlen = np.diff(np.append(starts, n))
        pos = np.arange(n, dtype=np.int64) - starts[run_id]
        seg = pos * S // nlen[run_id]
        comp = run_id * S + seg
        segstart = np.flatnonzero(np.r_[True, comp[1:] != comp[:-1]])
        ssum = np.add.reduceat(c_s, segstart)
        scnt = np.diff(np.append(segstart, n))
        sym = np.zeros(len(ssum), dtype=np.int64)
        for t_ in THRESH:
            sym += (ssum > t_ * 100 * scnt).astype(np.int64)
        return pa.table({
            "user_id": pa.array(u_s[segstart]),
            "seg": pa.array(seg[segstart]),
            "symbol": pa.array(sym)})

    return hash_exchange_groups(ds, ["user_id"], part_fn)


def _q_seasonal_naive_error(sf_dir):
    """FORECAST BACKTEST (seasonal-naive baseline): predict each day's
    event count with the same weekday one week earlier and score MAE /
    bias over the dense calendar — the model-evaluation loop every
    forecasting pipeline needs.  Combiner-first day counts (the series
    is CALENDAR-BOUNDED, so the scoring runs driver-side over days,
    never rows); the error sums are exact integers and MAE is one
    float division, mirrored by the generate_series + lag(7) oracle."""
    import ray.data

    from engine.rayds.shuffle import grouped_count

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts"])

    def day_fn(t: pa.Table) -> pa.Table:
        day = (t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
               // 86_400_000_000)
        return pa.table({"day": pa.array(day.astype(np.int64))})

    counts = grouped_count(
        ds.map_batches(day_fn, batch_format="pyarrow", batch_size=None,
                       zero_copy_batch=True), ["day"], out_col="n")
    t = pa.concat_tables(
        [b for b in counts.iter_batches(batch_format="pyarrow")])
    day = t["day"].to_numpy()
    n = t["n"].to_numpy()
    lo, hi = int(day.min()), int(day.max())
    dense = np.zeros(hi - lo + 1, dtype=np.int64)
    dense[day - lo] = n
    if len(dense) <= 7:
        return pa.table({"n_days": pa.array([0], type=pa.int64()),
                         "abs_err": pa.array([0], type=pa.int64()),
                         "bias": pa.array([0], type=pa.int64()),
                         "mae": pa.array([0.0], type=pa.float64())})
    actual = dense[7:]
    pred = dense[:-7]
    err = actual - pred
    nd = len(err)
    abs_err = int(np.abs(err).sum())
    bias = int(err.sum())
    return pa.table({
        "n_days": pa.array([nd], type=pa.int64()),
        "abs_err": pa.array([abs_err], type=pa.int64()),
        "bias": pa.array([bias], type=pa.int64()),
        "mae": pa.array([float(abs_err) / float(nd)],
                        type=pa.float64())})


def _q_source_vocab_overlap(sf_dir):
    """CORPUS SIMILARITY MATRIX: vocabulary Jaccard between every
    source pair — which crawls duplicate each other's language.  Per
    doc-block distinct (source, word) rows (each doc is one row, so
    block dedup is exact after the pair-count rollup), per-word source
    lists explode to pairs (≤ sources² per word — catalog-bounded),
    combiner-first pair counts + per-source vocab sizes, jaccard = one
    float division of exact integers per pair."""
    import ray.data

    from engine.ops.basket import cooccur_pairs
    from engine.rayds.shuffle import equi_join, grouped_count

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["source", "text"])

    def swords(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        words = pc.split_pattern(t["text"], " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        flat = pc.list_flatten(words)
        lens = pc.list_value_length(words).to_numpy(
            zero_copy_only=False)
        src = np.repeat(t["source"].to_numpy(zero_copy_only=False),
                        lens)
        return pa.table({"source": pa.array(src), "word": flat})

    sw = docs.map_batches(swords, batch_format="pyarrow",
                          batch_size=None, zero_copy_batch=True)
    pairs = grouped_count(sw, ["source", "word"], out_col="_d",
                          use_shuffle="auto").materialize()
    # source vocab gets an integer code so the pair explode stays int64
    srcs = sorted(set(pa.concat_tables(
        [b for b in grouped_count(pairs.select_columns(["source"]),
                                  ["source"], out_col="nv",
                                  use_shuffle=False)
         .iter_batches(batch_format="pyarrow")])["source"].to_pylist()))
    code = {s: i for i, s in enumerate(srcs)}

    src_vals = pa.array(srcs)

    def coded(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        c = pc.index_in(t["source"], value_set=src_vals).cast(
            pa.int64())
        return pa.table({"word": t["word"], "scode": c})

    cp = cooccur_pairs(
        pairs.map_batches(coded, batch_format="pyarrow",
                          batch_size=None),
        "word", "scode", out_cols=("s1", "s2"))
    inter = grouped_count(cp, ["s1", "s2"], out_col="inter",
                          use_shuffle="auto")
    sizes = grouped_count(pairs.select_columns(["source"]), ["source"],
                          out_col="nv", use_shuffle=False)
    sz = pa.concat_tables(
        [b for b in sizes.iter_batches(batch_format="pyarrow")])
    nv = np.zeros(len(srcs), dtype=np.int64)
    for s, v in zip(sz["source"].to_pylist(), sz["nv"].to_pylist()):
        nv[code[s]] = v

    it = pa.concat_tables(
        [b for b in inter.iter_batches(batch_format="pyarrow")])
    s1 = it["s1"].to_numpy()
    s2 = it["s2"].to_numpy()
    iv = it["inter"].to_numpy()
    c1 = nv[s1]
    c2 = nv[s2]
    jac = iv.astype(np.float64) / (c1 + c2 - iv).astype(np.float64)
    order = np.lexsort((s2, s1))
    return pa.table({
        "source_a": pa.array([srcs[i] for i in s1[order]]),
        "source_b": pa.array([srcs[i] for i in s2[order]]),
        "inter": pa.array(iv[order]),
        "va": pa.array(c1[order]),
        "vb": pa.array(c2[order]),
        "jaccard": pa.array(jac[order], type=pa.float64())})


def _q_word_freq_cm(sf_dir):
    """COUNT-MIN word frequencies (○ — the streaming frequency sketch
    next to Misra–Gries): per-block (4 × 16384) linear partials SUM
    through the tree fold (merged sketch == single-pass sketch exactly,
    so partitioning cannot change an estimate), zero exchanges, 512 KiB
    driver state.  The query SELF-VALIDATES: it returns the exact
    top-20 word counts beside their sketch estimates and asserts the
    CM guarantee est ≥ exact on every row (the ε·N upper bound is
    pinned by the pytest)."""
    import pyarrow.compute as pc

    from engine.ops.sketch import _hash_words, cm_estimate, \
        cm_word_counts
    from engine.rayds.shuffle import grouped_count

    def explode(batch: pa.Table) -> pa.Table:
        words = pc.split_pattern(batch["text"], " ")
        return pa.table({"word": pc.list_flatten(words)})

    docs = _docs(sf_dir).select_columns(["text"])
    counts = grouped_count(
        docs.map_batches(explode, batch_format="pyarrow",
                         batch_size=None, zero_copy_batch=True),
        ["word"], out_col="cnt", use_shuffle="auto")
    top = pa.concat_tables([b for b in counts.sort(
        ["cnt", "word"], descending=[True, False]).limit(20)
        .iter_batches(batch_format="pyarrow")]).combine_chunks()

    m, ntok = cm_word_counts(docs, "text")
    wcol = top["word"].combine_chunks()
    if isinstance(wcol, pa.ChunkedArray):
        wcol = wcol.chunk(0)
    h = _hash_words(wcol)
    est = cm_estimate(m, h)
    exact = top["cnt"].to_numpy()
    if (est < exact).any():
        raise AssertionError("count-min underestimated — impossible")
    return pa.table({"word": top["word"],
                     "exact_n": pa.array(exact),
                     "est_n": pa.array(est),
                     "n_tokens": pa.array(
                         np.full(len(est), ntok, dtype=np.int64))})


def _q_fk_violations(sf_dir):
    """REFERENTIAL-INTEGRITY AUDIT (the FK data-quality gate a
    warehouse load runs): orphan counts for lineitem→orders and
    orders→customer as PRESENCE-MASK reductions — child and parent
    keys union with a side flag, one combiner-first min/max exchange
    per relationship, orphan ⟺ a key whose mask never saw the parent
    side.  No broadcast of the (data-scale) parent key set anywhere."""
    import ray.data

    from engine.rayds.shuffle import grouped_agg

    def orphans(child_path, child_col, parent_path, parent_col):
        child = ray.data.read_parquet(child_path, columns=[child_col])
        parent = ray.data.read_parquet(parent_path,
                                       columns=[parent_col])

        def tag(side):
            def fn(t: pa.Table) -> pa.Table:
                col = t[child_col if side == 0 else parent_col] \
                    .cast(pa.int64())
                return pa.table({
                    "k": col,
                    "child": pa.array(np.full(t.num_rows, 1 - side,
                                              dtype=np.int64)),
                    "parent": pa.array(np.full(t.num_rows, side,
                                               dtype=np.int64))})
            return fn

        u = child.map_batches(tag(0), batch_format="pyarrow",
                              batch_size=None).union(
            parent.map_batches(tag(1), batch_format="pyarrow",
                               batch_size=None))
        masks = grouped_agg(u, ["k"], [("child", "max"),
                                       ("parent", "max")],
                            ["has_child", "has_parent"],
                            plan="shuffle")

        def cnt(t: pa.Table) -> pa.Table:
            hc = t["has_child"].to_numpy()
            hp = t["has_parent"].to_numpy()
            return pa.table({"n": pa.array(
                [int(((hc == 1) & (hp == 0)).sum())],
                type=pa.int64())})

        from engine.rayds.shuffle import tree_fold_refs

        t = tree_fold_refs(
            masks.map_batches(cnt, batch_format="pyarrow",
                              batch_size=None),
            lambda tbls: pa.concat_tables(tbls))
        return int(pa.compute.sum(t["n"]).as_py())

    v1 = orphans(f"{sf_dir}/lineitem.parquet", "l_orderkey",
                 f"{sf_dir}/orders.parquet", "o_orderkey")
    v2 = orphans(f"{sf_dir}/orders.parquet", "o_custkey",
                 f"{sf_dir}/customer.parquet", "c_custkey")
    return pa.table({
        "relationship": pa.array(["lineitem->orders",
                                  "orders->customer"]),
        "n_orphans": pa.array([v1, v2], type=pa.int64())})


def _q_priority_percent_rank(sf_dir):
    """PERCENT_RANK window function (completing the rank family next
    to ntile / cume_dist / rank): each order's percent_rank of
    totalprice within its priority class — (rank−1)/(n−1) with SQL
    rank() tie semantics (ties share the FIRST index of their value
    run).  One hash exchange on the priority key; per-partition
    lexsort + run-start gather, exact integers into one float
    division."""
    import ray.data

    from engine.rayds.shuffle import hash_exchange_groups

    ds = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                               columns=["o_orderkey",
                                        "o_orderpriority",
                                        "o_totalprice"])

    def part_fn(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_part"])
        n = g.num_rows
        if n == 0:
            return pa.table({"o_orderkey": g["o_orderkey"],
                             "pr": pa.array([], type=pa.float64())})
        prio = g["o_orderpriority"].to_numpy(zero_copy_only=False)
        cents = np.rint(g["o_totalprice"].to_numpy() * 100.0).astype(
            np.int64)
        key = g["o_orderkey"].to_numpy()
        _, pcode = np.unique(prio, return_inverse=True)
        order = np.lexsort((cents, pcode))
        p_s, c_s, k_s = pcode[order], cents[order], key[order]
        newg = np.r_[True, p_s[1:] != p_s[:-1]]
        gstart = np.flatnonzero(newg)
        grun = np.cumsum(newg) - 1
        glen = np.diff(np.append(gstart, n))
        pos = np.arange(n, dtype=np.int64) - gstart[grun]
        # rank = first position of the value run within the group
        newv = newg | np.r_[True, c_s[1:] != c_s[:-1]]
        vstart_pos = pos[np.flatnonzero(newv)]
        vrun = np.cumsum(newv) - 1
        rank0 = vstart_pos[vrun]          # 0-based rank (ties share)
        denom = (glen[grun] - 1).astype(np.float64)
        pr = np.where(denom > 0, rank0.astype(np.float64)
                      / np.where(denom > 0, denom, 1.0), 0.0)
        return pa.table({"o_orderkey": pa.array(k_s),
                         "pr": pa.array(pr, type=pa.float64())})

    return hash_exchange_groups(ds, ["o_orderpriority"], part_fn)


def _q_target_encode_type(sf_dir):
    """LEAVE-ONE-OUT TARGET ENCODING (the categorical-feature ML-prep
    transform; LOO prevents the self-leak a plain group mean has):
    per-type (Σcents, n) rolls up combiner-first, joins back
    adaptively, and every row's encoding is (Σ − x)/(n − 1) — exact
    integers into ONE float division, bit-identical to the SQL window
    mirror.  Singleton categories yield NULL-free −1 (the COALESCE
    mirror)."""
    import ray.data

    from engine.rayds.shuffle import equi_join, grouped_agg

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "event_type",
                                        "value"])

    def cents(t: pa.Table) -> pa.Table:
        c = np.rint(t["value"].to_numpy() * 100.0).astype(np.int64)
        return pa.table({"event_id": t["event_id"],
                         "event_type": t["event_type"],
                         "cents": pa.array(c),
                         "one": pa.array(np.ones(t.num_rows,
                                                 dtype=np.int64))})

    ev = ds.map_batches(cents, batch_format="pyarrow", batch_size=None,
                        zero_copy_batch=True).materialize()
    stats = grouped_agg(ev.select_columns(["event_type", "cents",
                                           "one"]),
                        ["event_type"], [("cents", "sum"),
                                         ("one", "sum")],
                        ["s", "n"], plan="tree")
    j = equi_join(ev, stats, "event_type", "event_type",
                  ["event_id", "cents"], ["s", "n"])

    def enc(t: pa.Table) -> pa.Table:
        s = t["s"].to_numpy()
        n = t["n"].to_numpy()
        x = t["cents"].to_numpy()
        loo = np.where(n > 1, (s - x).astype(np.float64)
                       / np.where(n > 1, n - 1, 1).astype(np.float64),
                       -1.0)
        return pa.table({"event_id": t["event_id"],
                         "loo_cents": pa.array(loo,
                                               type=pa.float64())})

    return j.map_batches(enc, batch_format="pyarrow", batch_size=None)


def _q_bloom_filter_fpr(sf_dir):
    """BLOOM SEMI-JOIN FPR AUDIT (○ — the sketch the minhash verify
    uses, surfaced and self-measured): build the Bloom bitmap over the
    purchasing-user id set (OR-reduced per-block partials), probe
    EVERY user through the broadcast filter, and report exact counts
    of members, passed probes, and false positives (passed −
    members) — correctness of the semi-join contract (no false
    negatives) is asserted in-query; the FPR bound is pinned by
    pytest."""
    import pyarrow.compute as pc
    import ray
    import ray.data

    from engine.ops.dedup import make_bloom_filter_fn, pairs_bloom
    from engine.rayds.shuffle import grouped_count, tree_fold_refs

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "event_type"])

    def buyers(t: pa.Table) -> pa.Table:
        f = t.filter(pc.equal(t["event_type"], "purchase"))
        u = f["user_id"].to_numpy()
        return pa.table({"a": pa.array(u), "b": pa.array(u)})

    members_ds = grouped_count(
        ds.map_batches(buyers, batch_format="pyarrow",
                       batch_size=None, zero_copy_batch=True),
        ["a", "b"], out_col="_d", use_shuffle="auto").materialize()
    bloom = ray.put(pairs_bloom(members_ds))

    users = grouped_count(ds.select_columns(["user_id"]), ["user_id"],
                          out_col="_u", use_shuffle="auto") \
        .materialize()
    n_users = users.count()
    n_members = members_ds.count()
    passed = users.map_batches(
        make_bloom_filter_fn(bloom, col="user_id"),
        batch_format="pyarrow", batch_size=None)

    def cnt(t: pa.Table) -> pa.Table:
        return pa.table({"n": pa.array([t.num_rows], type=pa.int64())})

    pt = tree_fold_refs(
        passed.map_batches(cnt, batch_format="pyarrow",
                           batch_size=None),
        lambda tbls: pa.concat_tables(tbls))
    n_passed = int(pa.compute.sum(pt["n"]).as_py())
    if n_passed < n_members:
        raise AssertionError("Bloom produced a false negative")
    return pa.table({
        "n_users": pa.array([n_users], type=pa.int64()),
        "n_members": pa.array([n_members], type=pa.int64()),
        "n_passed": pa.array([n_passed], type=pa.int64()),
        "n_false_pos": pa.array([n_passed - n_members],
                                type=pa.int64())})


def _q_zscore_normalize(sf_dir):
    """Z-SCORE STANDARDIZATION (completing the scaler family beside
    min-max and quantile-normalize): each event's (x − μ)/σ computed
    WITHOUT a float mean — algebraically (n·x − Σ)/√(n·Σx² − Σ²), so
    the numerator is an exact per-row integer, the radicand is one
    exact integer, and the whole row costs one sqrt + one division —
    bit-identical to the SQL mirror of the same expression.  Zero
    exchanges: decimal128 moment partials tree-fold, scalars broadcast
    into one streaming map."""
    import math

    import ray.data

    from engine.ops.stats import exact_moments

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "value"])

    def cents(t: pa.Table) -> pa.Table:
        c = np.rint(t["value"].to_numpy() * 100.0).astype(np.int64)
        return pa.table({"event_id": t["event_id"],
                         "c": pa.array(c)})

    ev = ds.map_batches(cents, batch_format="pyarrow", batch_size=None,
                        zero_copy_batch=True).materialize()
    m = exact_moments(ev, "c", "c")
    n, s, ss = m["n"], m["sx"], m["sxx"]
    denom = math.sqrt(float(n * ss - s * s))

    def z(t: pa.Table) -> pa.Table:
        c = t["c"].to_numpy()
        num = (n * c - s).astype(np.float64)
        return pa.table({"event_id": t["event_id"],
                         "z": pa.array(num / denom,
                                       type=pa.float64())})

    return ev.map_batches(z, batch_format="pyarrow", batch_size=None)


def _q_ngram_novelty(sf_dir):
    """NOVELTY / MEMORIZATION SCREEN: per document, the fraction of
    its DISTINCT word 5-grams that appear in no other document — the
    originality metric curation uses beside the boilerplate top-k.
    Offset-arithmetic gram explode → per-(gram, doc) dedup combiner →
    gram document-frequency rollup (one exchange) → df attaches back
    through the adaptive join → per-doc counts; novelty is one float
    division of exact integers."""
    import ray.data

    from engine.ops.text import ngram_explode
    from engine.rayds.shuffle import equi_join, grouped_agg, \
        grouped_count

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    grams = docs.map_batches(
        lambda b: ngram_explode(b, 5), batch_format="pyarrow",
        batch_size=None, zero_copy_batch=True)
    gd = grouped_count(grams, ["gram", "doc_id"], out_col="_occ",
                       use_shuffle=True).materialize()
    df = grouped_count(gd.select_columns(["gram"]), ["gram"],
                       out_col="df", use_shuffle=True)
    j = equi_join(gd, df, "gram", "gram", ["doc_id"], ["df"])

    def per_doc(t: pa.Table) -> pa.Table:
        uniq = (t["df"].to_numpy() == 1).astype(np.int64)
        return pa.table({"doc_id": t["doc_id"],
                         "one": pa.array(np.ones(t.num_rows,
                                                 dtype=np.int64)),
                         "uniq": pa.array(uniq)})

    rolled = grouped_agg(
        j.map_batches(per_doc, batch_format="pyarrow",
                      batch_size=None),
        ["doc_id"], [("one", "sum"), ("uniq", "sum")],
        ["n_grams", "n_unique"], plan="shuffle")

    def fin(t: pa.Table) -> pa.Table:
        ng = t["n_grams"].to_numpy()
        nu = t["n_unique"].to_numpy()
        return t.append_column(
            "novelty", pa.array(nu.astype(np.float64)
                                / ng.astype(np.float64),
                                type=pa.float64()))

    return rolled.map_batches(fin, batch_format="pyarrow",
                              batch_size=None)


def _q_regr2_price(sf_dir):
    """MULTIVARIATE least squares (price ~ quantity + discount) solved
    by EXACT-INTEGER Cramer's rule: the 3×3 normal-equation moment
    matrix folds as decimal128 partials (zero exchanges), all four
    determinants expand as exact Python-int polynomials, and each
    coefficient is ONE float division — the SQL oracle states the same
    determinant expressions in HUGEINT (entry magnitudes keep the
    expansion far below HUGEINT's 1.7e38 at any tested scale).
    Extends the univariate regr family to multiple features."""
    import decimal

    import ray.data

    from engine.rayds.shuffle import tree_fold_refs

    DEC = pa.decimal128(38, 0)
    COLS = ["n", "s1", "s2", "s11", "s22", "s12", "sy", "sy1", "sy2"]

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_quantity", "l_discount", "l_extendedprice"])

    def part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({c: pa.array([], type=DEC) for c in COLS})
        x1 = np.rint(t["l_quantity"].to_numpy()).astype(np.int64)
        x2 = np.rint(t["l_discount"].to_numpy() * 100.0).astype(
            np.int64)
        y = np.rint(t["l_extendedprice"].to_numpy() * 100.0).astype(
            np.int64)
        vals = {"n": len(x1), "s1": int(x1.sum()), "s2": int(x2.sum()),
                "s11": int((x1 * x1).sum()),
                "s22": int((x2 * x2).sum()),
                "s12": int((x1 * x2).sum()),
                "sy": int(y.sum()), "sy1": int((y * x1).sum()),
                "sy2": int((y * x2).sum())}
        return pa.table({c: pa.array([decimal.Decimal(v)], type=DEC)
                         for c, v in vals.items()})

    def fold(tbls: list[pa.Table]) -> pa.Table:
        t = pa.concat_tables(tbls).combine_chunks()
        if t.num_rows <= 1:
            return t
        sums = {c: decimal.Decimal(0) for c in COLS}
        for c in COLS:
            for v in t[c]:
                sums[c] += v.as_py()
        return pa.table({c: pa.array([sums[c]], type=DEC)
                         for c in COLS})

    f = tree_fold_refs(
        ds.map_batches(part, batch_format="pyarrow", batch_size=None,
                       zero_copy_batch=True), fold)
    m = {c: int(f[c][0].as_py()) for c in COLS}
    n, s1, s2 = m["n"], m["s1"], m["s2"]
    s11, s22, s12 = m["s11"], m["s22"], m["s12"]
    sy, sy1, sy2 = m["sy"], m["sy1"], m["sy2"]
    det = (n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)
           + s2 * (s1 * s12 - s11 * s2))
    det0 = (sy * (s11 * s22 - s12 * s12) - s1 * (sy1 * s22 - s12 * sy2)
            + s2 * (sy1 * s12 - s11 * sy2))
    det1 = (n * (sy1 * s22 - s12 * sy2) - sy * (s1 * s22 - s12 * s2)
            + s2 * (s1 * sy2 - sy1 * s2))
    det2 = (n * (s11 * sy2 - sy1 * s12) - s1 * (s1 * sy2 - sy1 * s2)
            + sy * (s1 * s12 - s11 * s2))
    return pa.table({
        "n": pa.array([n], type=pa.int64()),
        "b0": pa.array([float(det0) / float(det)], type=pa.float64()),
        "b_qty": pa.array([float(det1) / float(det)],
                          type=pa.float64()),
        "b_disc": pa.array([float(det2) / float(det)],
                           type=pa.float64())})


def _q_bounce_rate(sf_dir):
    """BOUNCE RATE (single-event sessions / sessions, per user) — the
    sessionize → per-session-size → per-user rollup COMPOSITION: one
    exchange sessionizes (30-min gap), a combiner-first rollup counts
    sessions and bounces, rate is one float division of exact ints;
    the SQL mirror is the full gaps-and-islands construction."""
    import ray.data

    from engine.rayds.shuffle import grouped_agg, sessionize

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts"])

    def us(t: pa.Table) -> pa.Table:
        return pa.table({"user_id": t["user_id"],
                         "ts_us": t["ts"].cast(pa.int64())})

    ev = ds.map_batches(us, batch_format="pyarrow", batch_size=None,
                        zero_copy_batch=True)
    sess = sessionize(ev, "user_id", "ts_us", 1_800_000_000)

    def flags(t: pa.Table) -> pa.Table:
        ne = t["n_events"].to_numpy()
        return pa.table({"user_id": t["user_id"],
                         "one": pa.array(np.ones(t.num_rows,
                                                 dtype=np.int64)),
                         "bounce": pa.array(
                             (ne == 1).astype(np.int64))})

    rolled = grouped_agg(
        sess.map_batches(flags, batch_format="pyarrow",
                         batch_size=None),
        ["user_id"], [("one", "sum"), ("bounce", "sum")],
        ["n_sessions", "n_bounce"], plan="shuffle")

    def fin(t: pa.Table) -> pa.Table:
        ns = t["n_sessions"].to_numpy()
        nb = t["n_bounce"].to_numpy()
        return t.append_column(
            "bounce_rate", pa.array(nb.astype(np.float64)
                                    / ns.astype(np.float64),
                                    type=pa.float64()))

    return rolled.map_batches(fin, batch_format="pyarrow",
                              batch_size=None)


def _q_survival_hazard(sf_dir):
    """SURVIVAL ANALYSIS (Kaplan-Meier hazard table for
    click→purchase conversion): per clicking user, the day offset from
    first click to the first purchase AT OR AFTER it (no purchase →
    right-censored at the corpus observation horizon).  One hash
    exchange computes the per-user (t, observed) pair vectorized
    (lexsort + per-run first-click / conditional-min-purchase); the
    day-offset table is HORIZON-BOUNDED, so at-risk counts are a
    driver-side reverse cumsum, and each day's hazard d/n is one float
    division of exact integers — the cumulative product (whose float
    order would be engine-dependent) is deliberately NOT emitted."""
    import ray.data

    from engine.rayds.shuffle import (dataset_minmax, grouped_agg,
                                      hash_exchange_groups)

    DAY = 86_400_000_000

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts", "event_type"])

    def us(t: pa.Table) -> pa.Table:
        return pa.table({"user_id": t["user_id"],
                         "ts_us": t["ts"].cast(pa.int64()),
                         "event_type": t["event_type"]})

    ev = ds.map_batches(us, batch_format="pyarrow", batch_size=None,
                        zero_copy_batch=True).materialize()
    horizon = int(dataset_minmax(ev, ["ts_us"])["ts_us"][1])

    def per_user(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_part"])
        n = g.num_rows
        empty = pa.table({"t": pa.array([], type=pa.int64()),
                          "ev": pa.array([], type=pa.int64()),
                          "one": pa.array([], type=pa.int64())})
        if n == 0:
            return empty
        u = g["user_id"].to_numpy()
        ts = g["ts_us"].to_numpy()
        et = g["event_type"].to_numpy(zero_copy_only=False)
        is_c = et == "click"
        is_p = et == "purchase"
        BIG = np.int64(1 << 62)
        cts = np.where(is_c, ts, BIG)
        order = np.lexsort((cts, u))
        u_s, c_s = u[order], cts[order]
        new = np.r_[True, u_s[1:] != u_s[:-1]]
        starts = np.flatnonzero(new)
        first_click = c_s[starts]          # BIG ⟹ the user never clicked
        run_id = np.cumsum(new) - 1
        # min purchase ts ≥ the user's first click, via a second sort
        fc_of_row = first_click[run_id[np.argsort(order,
                                                  kind="stable")]]
        pts = np.where(is_p & (ts >= fc_of_row), ts, BIG)
        order2 = np.lexsort((pts, u))
        u2, p2 = u[order2], pts[order2]
        new2 = np.r_[True, u2[1:] != u2[:-1]]
        starts2 = np.flatnonzero(new2)
        first_p = p2[starts2]
        # runs align: both sorts group by the same user set
        clicked = first_click < BIG
        fc = first_click[clicked]
        fp = first_p[clicked]
        observed = fp < BIG
        t = np.where(observed, (fp - fc) // DAY,
                     (horizon - fc) // DAY)
        return pa.table({"t": pa.array(t.astype(np.int64)),
                         "ev": pa.array(observed.astype(np.int64)),
                         "one": pa.array(np.ones(len(t),
                                                 dtype=np.int64))})

    per = hash_exchange_groups(ev, ["user_id"], per_user)
    rolled = grouped_agg(per, ["t"], [("ev", "sum"), ("one", "sum")],
                         ["d", "total"], plan="tree")
    tt = pa.concat_tables(
        [b for b in rolled.iter_batches(batch_format="pyarrow")])
    day = tt["t"].to_numpy()
    d = tt["d"].to_numpy()
    tot = tt["total"].to_numpy()
    order = np.argsort(day)
    day, d, tot = day[order], d[order], tot[order]
    n_risk = np.cumsum(tot[::-1])[::-1]
    hazard = d.astype(np.float64) / n_risk.astype(np.float64)
    return pa.table({"day": pa.array(day),
                     "n_risk": pa.array(n_risk.astype(np.int64)),
                     "n_event": pa.array(d),
                     "hazard": pa.array(hazard, type=pa.float64())})


def _q_decile_gains(sf_dir):
    """GAINS / LIFT TABLE (the model-evaluation companion to RFM):
    users rank by total spend DESC into exact SQL ntile(10) deciles
    (remainder buckets first, user_id tie-break — the rfm_segments
    machinery: unique (−spend·2²⁰ + uid) composite through one Ray
    native range sort + the two-phase prefix scan), then a 10-row
    rollup with cumulative spend share — each share is one float
    division of exact integer cents.  The 2²⁰ uid bound is the same
    documented assumption as rfm_segments."""
    import ray.data

    from engine.ops.scan import ordered_cumsum
    from engine.rayds.shuffle import equi_join, grouped_agg

    NT = 10

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "value"])

    def proj(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t["user_id"],
            "cents": pa.array(np.floor(t["value"].to_numpy() * 100.0)
                              .astype(np.int64))})

    per = grouped_agg(
        ds.map_batches(proj, batch_format="pyarrow", batch_size=None,
                       zero_copy_batch=True),
        ["user_id"], [("cents", "sum")], ["spend"]).materialize()
    n_users = per.count()
    q, r = divmod(n_users, NT)

    def key_fn(t: pa.Table) -> pa.Table:
        return pa.table({
            "k": pa.array(-t["spend"].to_numpy() * (1 << 20)
                          + t["user_id"].to_numpy()),
            "user_id": t["user_id"], "spend": t["spend"],
            "one": pa.array(np.ones(t.num_rows, dtype=np.int64))})

    keyed = per.map_batches(key_fn, batch_format="pyarrow",
                            batch_size=None, zero_copy_batch=True)
    pos = ordered_cumsum(keyed.sort("k").materialize(), "k", "one",
                         out_col="cum0")

    def bucket(t: pa.Table) -> pa.Table:
        pos0 = t["cum0"].to_numpy()
        head = r * (q + 1)
        dec = np.where(pos0 < head, pos0 // (q + 1),
                       r + (pos0 - head) // max(q, 1)) + 1
        return pa.table({"decile": pa.array(dec.astype(np.int64)),
                         "spend": t["spend"],
                         "one": t["one"]})

    rolled = grouped_agg(
        pos.map_batches(bucket, batch_format="pyarrow",
                        batch_size=None),
        ["decile"], [("one", "sum"), ("spend", "sum")],
        ["n_users", "cents"], plan="tree")
    t = pa.concat_tables(
        [b for b in rolled.iter_batches(batch_format="pyarrow")])
    order = np.argsort(t["decile"].to_numpy())
    dec = t["decile"].to_numpy()[order]
    nu = t["n_users"].to_numpy()[order]
    cents = t["cents"].to_numpy()[order]
    cum = np.cumsum(cents.astype(object))
    total = int(cum[-1])
    share = np.array([float(int(c)) / float(total) for c in cum])
    return pa.table({"decile": pa.array(dec),
                     "n_users": pa.array(nu),
                     "cents": pa.array(cents),
                     "cum_share": pa.array(share, type=pa.float64())})


def _q_ab_test_ztest(sf_dir):
    """A/B EXPERIMENT READOUT (two-proportion pooled z-test): users
    split deterministically by user_id parity; conversion = purchases
    / (clicks + purchases) per arm.  The four counts fold as 4-int
    per-block partials (zero exchanges); every float op of the z
    statistic — p1, p2, pooled p, the standard error, the ratio — is
    written in ONE fixed order mirrored parenthesis-for-parenthesis by
    the SQL oracle, so the doubles hash bit-identically."""
    import math

    import pyarrow.compute as pc
    import ray.data

    from engine.rayds.shuffle import tree_fold_refs

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "event_type"])

    def part(t: pa.Table) -> pa.Table:
        et = t["event_type"].to_numpy(zero_copy_only=False)
        rel = (et == "click") | (et == "purchase")
        u = t["user_id"].to_numpy()[rel]
        conv = (et[rel] == "purchase").astype(np.int64)
        arm = (u % 2).astype(np.int64)
        n1 = int((arm == 0).sum())
        x1 = int(conv[arm == 0].sum())
        n2 = int((arm == 1).sum())
        x2 = int(conv[arm == 1].sum())
        return pa.table({"n1": pa.array([n1], type=pa.int64()),
                         "x1": pa.array([x1], type=pa.int64()),
                         "n2": pa.array([n2], type=pa.int64()),
                         "x2": pa.array([x2], type=pa.int64())})

    t = tree_fold_refs(
        ds.map_batches(part, batch_format="pyarrow", batch_size=None,
                       zero_copy_batch=True),
        lambda tbls: pa.concat_tables(tbls))
    n1 = int(pc.sum(t["n1"]).as_py())
    x1 = int(pc.sum(t["x1"]).as_py())
    n2 = int(pc.sum(t["n2"]).as_py())
    x2 = int(pc.sum(t["x2"]).as_py())
    p1 = float(x1) / float(n1)
    p2 = float(x2) / float(n2)
    p = float(x1 + x2) / float(n1 + n2)
    se = math.sqrt((p * (1.0 - p)) * (1.0 / float(n1)
                                      + 1.0 / float(n2)))
    z = (p1 - p2) / se
    return pa.table({
        "n_a": pa.array([n1], type=pa.int64()),
        "conv_a": pa.array([x1], type=pa.int64()),
        "n_b": pa.array([n2], type=pa.int64()),
        "conv_b": pa.array([x2], type=pa.int64()),
        "z": pa.array([z], type=pa.float64())})


def _q_nearest_purchase(sf_dir):
    """NEAREST-IN-TIME JOIN (completing the as-of triple: backward =
    asof_click_view, forward = next_purchase, nearest = here): for
    each click, the same user's closest purchase in EITHER direction —
    |Δt| minimized, ties to the EARLIER purchase.  One exchange; per
    partition the two candidates come from one left and one right
    searchsorted over the same (user_rank·span + dt) composite, and
    the comparison 2·|Δ| vs 2·|Δ| is pure integer (no float time
    anywhere).  Clicks with no purchase report −1."""
    import ray.data

    from engine.rayds.shuffle import hash_exchange_groups

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts", "event_id",
                                        "event_type"])

    def part_fn(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_part"])
        n = g.num_rows
        empty = pa.table({"event_id": pa.array([], type=pa.int64()),
                          "nearest_us": pa.array([], type=pa.int64())})
        if n == 0:
            return empty
        u = g["user_id"].to_numpy()
        ts = g["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy()
        et = g["event_type"].to_numpy(zero_copy_only=False)
        is_c = et == "click"
        is_p = et == "purchase"
        if not is_c.any():
            return empty
        t0 = ts.min()
        dt = ts - t0
        span = int(dt.max()) + 2
        _, urank = np.unique(u, return_inverse=True)
        comp = urank.astype(np.int64) * span + dt
        pc_sorted = np.sort(comp[is_p])
        cq = comp[is_c]
        cu = urank[is_c].astype(np.int64)
        BIG = np.int64(1 << 62)
        if len(pc_sorted) == 0:
            # a partition whose users never purchase: every click −1
            return pa.table({
                "event_id": pa.array(eid[is_c]),
                "nearest_us": pa.array(
                    np.full(int(is_c.sum()), -1, dtype=np.int64))})
        # candidate after (first ≥ query) and before (last ≤ query)
        pos_r = np.searchsorted(pc_sorted, cq, side="left")
        ok_r = (pos_r < len(pc_sorted)) & (
            pc_sorted[np.minimum(pos_r, max(len(pc_sorted) - 1, 0))]
            // span == cu)
        after = np.where(ok_r, pc_sorted[np.minimum(
            pos_r, max(len(pc_sorted) - 1, 0))], BIG)
        pos_l = np.searchsorted(pc_sorted, cq, side="right") - 1
        ok_l = (pos_l >= 0) & (
            pc_sorted[np.maximum(pos_l, 0)] // span == cu)
        before = np.where(ok_l, pc_sorted[np.maximum(pos_l, 0)], -BIG)
        d_after = after - cq
        d_before = cq - before
        # nearest with tie → the EARLIER purchase (the 'before' side)
        use_before = ok_l & (~ok_r | (d_before <= d_after))
        chosen = np.where(use_before, before,
                          np.where(ok_r, after, np.int64(-1)))
        has = ok_l | ok_r
        out = np.where(has, (chosen % span) + t0, np.int64(-1))
        return pa.table({"event_id": pa.array(eid[is_c]),
                         "nearest_us": pa.array(out.astype(np.int64))})

    return hash_exchange_groups(ds, ["user_id"], part_fn)


_ZORDER_CHUNK = 128  # logical rows per layout chunk


def _q_zorder_locality(sf_dir):
    """Z-ORDER CLUSTERING EFFECTIVENESS (○ — the measured WHY behind
    zorder_top100/zorder_range_scan): images land in LOGICAL
    fixed-size chunks (C = _ZORDER_CHUNK rows) under (a) arrival order
    (chunk = seq-rank // C) and (b) Morton order (chunk = z-rank //
    C); each layout reports its mean per-chunk bounding-box area — the quantity that decides how
    many row-groups a spatial range scan can skip.  Logical chunks
    (not physical Ray blocks) keep the statistic DETERMINISTIC —
    physical block boundaries drift with Ray's load-dependent split
    decisions.  Plan: one streaming pass folds the (z, seq) pairs
    (2 int64s per row, budget-guarded) and broadcasts the z-rank
    permutation; each layout is then ONE distributed combiner-first
    grouped min/max + tiny fold.  Past the budget the Morton chunks
    fall back to fixed z-prefix tiles (rank-free, fully distributed).
    No SQL oracle (the statistic depends on the engine's chunking
    rule, which SQL cannot see)."""
    import ray
    import ray.data

    from engine.ops.zorder import morton2
    from engine.rayds import imagetab
    from engine.rayds.shuffle import grouped_agg

    enc = imagetab.image_dataset(sf_dir).select_columns(
        ["image_id", "x", "y"])

    def add_z(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        xi = np.floor(t["x"].to_numpy() * 100.0).astype(np.int64)
        yi = np.floor(t["y"].to_numpy() * 100.0).astype(np.int64)
        seq = pc.cast(pc.utf8_slice_codeunits(t["image_id"], 3, 32),
                      pa.int64())
        return pa.table({"x": t["x"], "y": t["y"], "seq": seq,
                         "z": pa.array(morton2(xi, yi))})

    zd = enc.map_batches(add_z, batch_format="pyarrow",
                         batch_size=None,
                         zero_copy_batch=True).materialize()

    budget_ok = True
    zs, seqs, tot = [], [], 0
    for b in zd.select_columns(["z", "seq"]).iter_batches(
            batch_format="pyarrow"):
        zs.append(b["z"].to_numpy())
        seqs.append(b["seq"].to_numpy())
        tot += len(b)
        if tot > _FOLD_BUDGET:
            budget_ok = False
            break
    rref = None
    if budget_ok:
        za = np.concatenate(zs) if zs else np.empty(0, np.int64)
        sa = np.concatenate(seqs) if seqs else np.empty(0, np.int64)
        # RANK-based chunks for BOTH layouts, looked up via the sorted
        # seq vocabulary — no assumption that seq values are dense or
        # 0-based (a sparse/1-based event-id scheme would break a
        # scatter-indexed table and mis-bucket seq // C)
        sorder = np.argsort(sa, kind="stable")
        seq_sorted = sa[sorder]
        ranks = np.arange(len(sa), dtype=np.int64)
        # aligned with seq_sorted: arrival rank IS the sorted position
        arr_by_sorted = ranks // _ZORDER_CHUNK
        zorder_ = np.lexsort((sa, za))
        mor_chunk = np.empty(len(sa), dtype=np.int64)
        mor_chunk[zorder_] = ranks // _ZORDER_CHUNK
        rref = ray.put((seq_sorted, arr_by_sorted, mor_chunk[sorder]))

    def chunks(t: pa.Table) -> pa.Table:
        seq = t["seq"].to_numpy()
        if rref is not None:
            from engine.rayds.bcast import cached

            keys, ac, mc = cached(rref)
            pos = np.searchsorted(keys, seq)
            ca = ac[pos]
            cm = mc[pos]
        else:  # rank-free fallback: fixed z-prefix spatial tiles
            cm = t["z"].to_numpy() >> 14
            ca = seq // _ZORDER_CHUNK
        return pa.table({"x": t["x"], "y": t["y"],
                         "ca": pa.array(ca), "cm": pa.array(cm)})

    ck = zd.map_batches(chunks, batch_format="pyarrow", batch_size=None)

    def layout_stat(key, label):
        agg = grouped_agg(
            ck.select_columns([key, "x", "y"]), [key],
            [("x", "min"), ("x", "max"), ("y", "min"), ("y", "max")],
            ["x0", "x1", "y0", "y1"], plan="tree")
        t = pa.concat_tables(
            [b for b in agg.iter_batches(batch_format="pyarrow")])
        area = ((t["x1"].to_numpy() - t["x0"].to_numpy())
                * (t["y1"].to_numpy() - t["y0"].to_numpy()))
        n = len(area)
        return pa.table({
            "layout": pa.array([label]),
            "n_blocks": pa.array([n], type=pa.int64()),
            "mean_bbox_area": pa.array(
                [float(area.mean()) if n else 0.0], type=pa.float64())})

    return pa.concat_tables([layout_stat("ca", "arrival"),
                             layout_stat("cm", "morton")])


def _q_region_simplify_stats(sf_dir):
    """DISTRIBUTED GEOMETRY SIMPLIFICATION (○ — surfaces the
    Douglas-Peucker kernel in a pipeline): the dense 32-gon footprint
    layer simplifies at tolerance 0.2 as a Dataset map (rings ride as
    WKT rows; per-poly work is bounded by the LAYER, the broadcast
    side by design), reporting per-polygon vertex counts before/after
    and the area ratio.  The pytest pins vertex reduction ≥ 2×, area
    ratio within [0.9, 1.0] (DP under-approximates a convex ring) and
    validity of every simplified polygon.  No SQL oracle (DuckDB has
    no geometry kernels here)."""
    import ray.data

    from engine.geo import from_wkt, to_wkt
    from engine.geo.constructive import simplify
    from engine.geo.measure import area as _area
    from engine.geo.predicates import is_valid
    from engine.rayds import imagetab

    layer = imagetab.make_dense_layer(n_polys=512)
    polys = layer.polys
    wkts = [to_wkt(polys.get(i)) for i in range(len(layer.poly_ids))]
    ds = ray.data.from_arrow(pa.table({
        "poly_id": pa.array(layer.poly_ids),
        "wkt": pa.array(wkts),
    })).repartition(8)

    TOL = 0.2

    def simp(t: pa.Table) -> pa.Table:
        ids = t["poly_id"].to_numpy()
        out_b, out_a, ratio, valid = [], [], [], []
        for w in t["wkt"].to_pylist():  # bounded by the layer side
            g = from_wkt(w)
            s = simplify(g, TOL)
            a0, a1 = _area(g), _area(s)
            out_b.append(_nverts(g))
            out_a.append(_nverts(s))
            ratio.append(a1 / a0 if a0 else 1.0)
            valid.append(bool(is_valid(s)))
        return pa.table({
            "poly_id": pa.array(ids),
            "n_before": pa.array(out_b, type=pa.int64()),
            "n_after": pa.array(out_a, type=pa.int64()),
            "area_ratio": pa.array(ratio, type=pa.float64()),
            "valid": pa.array(valid, type=pa.bool_())})

    return ds.map_batches(simp, batch_format="pyarrow",
                          batch_size=None)


def _nverts(g) -> int:
    from engine.geo.coordinates import get_coordinates

    return int(len(get_coordinates(g)))


def _q_crossmodal_dup_clusters(sf_dir):
    """CROSS-MODAL DEDUP CLUSTERS (○ — the multi-signal curation
    pattern: a document is a duplicate if EITHER its text or its
    embedding says so): the MinHash-verified text pairs UNION the
    exact cosine embedding pairs (vec_id i is doc i's embedding by
    schema intent) feed one connected-components pass — text-similar
    chains and embedding-similar chains merge into single clusters
    across modalities.  Both pair generators and the CC are the
    existing distributed plans; pytest checks the labels against a
    driver union-find over the same collected pair set."""
    from engine.ops import dedup
    from engine.ops.graph import connected_components

    text_pairs = dedup.minhash_verified_pairs(
        _docs(sf_dir).select_columns(["doc_id", "text"]),
        threshold=0.4)

    def tp(t: pa.Table) -> pa.Table:
        return t.select(["a", "b"])

    emb_pairs = dedup.embed_dedup_pairs(_embeddings(sf_dir),
                                        threshold=0.4, num_blocks=8)

    def ep(t: pa.Table) -> pa.Table:
        return t.select(["a", "b"])

    edges = text_pairs.map_batches(tp, batch_format="pyarrow",
                                   batch_size=None).union(
        emb_pairs.map_batches(ep, batch_format="pyarrow",
                              batch_size=None))
    return connected_components(edges)


def _img_point_field(sf_dir):
    """(x, y, v=w, id=seq) point-field Dataset shared by the
    geostatistics queries (semivariogram / ripley_k) — ONE place
    encodes the image_id→seq slice and the value column, so the two
    engines and their SQL oracles cannot desynchronize."""
    import pyarrow.compute as pc

    from engine.rayds.imagetab import image_dataset

    def prep(t: pa.Table) -> pa.Table:
        seq = pc.cast(pc.utf8_slice_codeunits(t["image_id"], 3, 32),
                      pa.int64())
        return pa.table({"x": t["x"], "y": t["y"],
                         "v": pc.cast(t["w"], pa.int64()), "id": seq})

    return image_dataset(sf_dir).select_columns(
        ["image_id", "x", "y", "w"]).map_batches(
        prep, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True)



def _q_semivariogram(sf_dir):
    """EMPIRICAL SEMIVARIOGRAM (Matheron estimator) of image width over
    the geotag point field: γ(bin) = Σ(v_i−v_j)²/(2·N) for pairs with
    distance ≤ 2.0, 8 distance bins — the classic geostatistical
    spatial-dependence curve.  The cell-partitioned join machinery
    serves as the PAIR GENERATOR: cell = max-lag grid, owners join
    ring-1 replicas in ONE hash exchange, each pair counted exactly
    once by the owner-of-smaller-id rule; per-group partials are
    integer (bin, count, Σdv²) rows (≤ 8 per group) tree-folded
    driver-side; the one float division per bin mirrors the SQL
    verbatim (exact-integer sums ⇒ bit-identical doubles)."""
    from engine.ops.variogram import semivariogram

    return semivariogram(_img_point_field(sf_dir), "x", "y", "v", "id",
                         max_lag=2.0, nbins=8)



def _q_ripley_k(sf_dir):
    """RIPLEY'S K FUNCTION (point-pattern analysis): K̂(r) =
    A·2·N(d ≤ r)/(n·(n−1)) at the 8 cumulative lag-bin edges over the
    geotag field (A = the 100×100 world area) — clustering vs CSR
    diagnosis, the cumulative companion of the semivariogram.  Reuses
    the ring-1 cell pair generator (one hash exchange, pair-once rule);
    the cumulative sum and the one float expression per bin run on the
    8-row driver-side result, mirrored verbatim in SQL."""
    import pyarrow.parquet as pq

    from engine.ops.variogram import semivariogram

    sv = semivariogram(_img_point_field(sf_dir), "x", "y", "v", "id",
                       max_lag=2.0, nbins=8)
    # one image row per event row: the point count reads from parquet
    # metadata instead of a whole extra Dataset execution (~0.5-1 s
    # fixed cost each in Ray 2.49)
    n = pq.ParquetFile(f"{sf_dir}/events.parquet").metadata.num_rows
    counts = np.zeros(8, dtype=np.int64)
    if sv.num_rows:
        counts[sv["bin"].to_numpy()] = sv["n_pairs"].to_numpy()
    cum = np.cumsum(counts)
    k = 10000.0 * 2.0 * cum.astype(np.float64) / (n * (n - 1.0))
    return pa.table({"bin": pa.array(np.arange(8, dtype=np.int64)),
                     "cum_pairs": pa.array(cum),
                     "k_hat": pa.array(k)})



def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "cell_counts": _q_cell_counts,
        "join_covers": _q_join_covers,
        "join_contains": _q_join_contains,
        "tile_assign": _q_tile_assign,
        "tile_counts": _q_tile_counts,
        "dwithin_pairs": _q_dwithin,
        "knn_centers": _q_knn_centers,
        "total_bounds": _q_total_bounds,
        "layer_measures": _q_layer_measures,
        "semi_join": _q_semi_join,
        "anti_join": _q_anti_join,
        "join_covers_cellpart": _q_join_covers_cellpart,
        "join_covers_s2part": _q_join_covers_s2part,
        "join_covers_hexpart": _q_join_covers_hexpart,
        "join_covers_h3part": _q_join_covers_h3part,
        "join_overlaps_range": _q_join_overlaps_range,
        "window_agg": _q_window_agg,
        "asof_click_view": _q_asof_click_view,
        "tile_mosaics": _q_tile_mosaics,
        "tile_region_vectors": _q_tile_region_vectors,
        "sample_images": _q_sample_images,
        "lang_topwords": _q_lang_topwords,
        "stratified_sample": _q_stratified_sample,
        "wkb_roundtrip": _q_wkb_roundtrip,
        "wkbz_roundtrip": _q_wkbz_roundtrip,
        "affine_bounds": _q_affine_bounds,
        "tile_clip_area": _q_tile_clip_area,
        "token_stats": _q_token_stats,
        "word_topk": _q_word_topk,
        "dedup_exact": _q_dedup_exact,
        "lang_quality": _q_lang_quality,
        "minhash_pairs": _q_minhash_pairs,
        "simhash_pairs": _q_simhash_pairs,
        "ann_topk": _q_ann_topk,
        "embed_dedup": _q_embed_dedup,
        "psnr_validate": _q_psnr_validate,
        "img_features": _q_img_features,
        "order_revenue": _q_order_revenue,
        "cust_urgent": _q_cust_urgent,
        "pricing_summary": _q_pricing_summary,
        "rasterize_cover": _q_rasterize_cover,
        "value_quantiles": _q_value_quantiles,
        "distinct_users": _q_distinct_users,
        "session_agg": _q_session_agg,
        "session_agg_split": _q_session_agg_split,
        "asof_split": _q_asof_split,
        "video_frames": _q_video_frames,
        "minhash_verified": _q_minhash_verified,
        "ann_topk_lsh": _q_ann_topk_lsh,
        "ann_topk_ivf": _q_ann_topk_ivf,
        "doc_fingerprint": _q_doc_fingerprint,
        "ngram_jaccard": _q_ngram_jaccard,
        "dedup_clusters": _q_dedup_clusters,
        "cc_iterative": _q_cc_iterative,
        "bm25_topk": _q_bm25_topk,
        "zorder_top100": _q_zorder_top100,
        "heavy_hitters": _q_heavy_hitters,
        "interval_join": _q_interval_join,
        "value_quantiles_sketch": _q_value_quantiles_sketch,
        "pack_sequences": _q_pack_sequences,
        "dedup_canonical": _q_dedup_canonical,
        "kmeans_embed": _q_kmeans_embed,
        "pivot_user_events": _q_pivot_user_events,
        "props_topk": _q_props_topk,
        "lag_gap": _q_lag_gap,
        "hopping_window": _q_hopping_window,
        "q3_topk": _q_q3_topk,
        "rollup_counts": _q_rollup_counts,
        "region_revenue": _q_region_revenue,
        "corr_qty_price": _q_corr_qty_price,
        "regr_price_qty": _q_regr_price_qty,
        "median_value": _q_median_value,
        "mode_user": _q_mode_user,
        "latest_event": _q_latest_event,
        "contamination": _q_contamination,
        "knn_join": _q_knn_join,
        "funnel_steps": _q_funnel_steps,
        "value_percentiles": _q_value_percentiles,
        "pareto_orders": _q_pareto_orders,
        "crosstab_hours": _q_crosstab_hours,
        "pii_redact": _q_pii_redact,
        "mix_sources": _q_mix_sources,
        "doc_dup_stats": _q_doc_dup_stats,
        "zonal_stats": _q_zonal_stats,
        "tile_pyramid": _q_tile_pyramid,
        "grouped_percentiles": _q_grouped_percentiles,
        "trajectory_stats": _q_trajectory_stats,
        "rolling_value": _q_rolling_value,
        "time_window": _q_time_window,
        "markov_transitions": _q_markov_transitions,
        "idf_vocab": _q_idf_vocab,
        "bigram_topk": _q_bigram_topk,
        "shuffle_positions": _q_shuffle_positions,
        "nation_flow": _q_nation_flow,
        "anomaly_zscore": _q_anomaly_zscore,
        "cohort_retention": _q_cohort_retention,
        "copurchase_topk": _q_copurchase_topk,
        "big_orders": _q_big_orders,
        "tfidf_topterms": _q_tfidf_topterms,
        "followup_pairs": _q_followup_pairs,
        "part_order_hist": _q_part_order_hist,
        "dau_wau": _q_dau_wau,
        "monthly_growth": _q_monthly_growth,
        "value_histogram": _q_value_histogram,
        "first_touch": _q_first_touch,
        "cube_counts": _q_cube_counts,
        "user_running_total": _q_user_running_total,
        "centroid_by_label": _q_centroid_by_label,
        "order_gap_hist": _q_order_gap_hist,
        "common_paths": _q_common_paths,
        "cell_density_stats": _q_cell_density_stats,
        "lift_pairs": _q_lift_pairs,
        "region_top_customers": _q_region_top_customers,
        "brand_share": _q_brand_share,
        "curation_pipeline": _q_curation_pipeline,
        "user_event_path": _q_user_event_path,
        "triangle_count": _q_triangle_count,
        "phash_neardup": _q_phash_neardup,
        "value_ntile": _q_value_ntile,
        "lineitem_rank": _q_lineitem_rank,
        "fuzzy_title_pairs": _q_fuzzy_title_pairs,
        "pagerank_top20": _q_pagerank_top20,
        "q4_priority": _q_q4_priority,
        "cust_order_dist": _q_cust_order_dist,
        "promo_share": _q_promo_share,
        "cust_no_urgent": _q_cust_no_urgent,
        "users_both_halves": _q_users_both_halves,
        "session_quantiles": _q_session_quantiles,
        "bfs_hops4": _q_bfs_hops4,
        "user_active_time": _q_user_active_time,
        "click_nobuy_days": _q_click_nobuy_days,
        "distinct_users_hll": _q_distinct_users_hll,
        "calendar_fill": _q_calendar_fill,
        "locf_value": _q_locf_value,
        "csv_roundtrip": _q_csv_roundtrip,
        "train_val_split": _q_train_val_split,
        "open_orders_daily": _q_open_orders_daily,
        "feature_hash_counts": _q_feature_hash_counts,
        "ann_range": _q_ann_range,
        "nearest_poly": _q_nearest_poly,
        "grouped_value_sketch": _q_grouped_value_sketch,
        "quality_buckets": _q_quality_buckets,
        "label_balance": _q_label_balance,
        "spearman_corr": _q_spearman_corr,
        "dasymetric_alloc": _q_dasymetric_alloc,
        "daily_autocorr": _q_daily_autocorr,
        "cdc_state": _q_cdc_state,
        "json_roundtrip": _q_json_roundtrip,
        "wds_shards": _q_wds_shards,
        "getis_ord": _q_getis_ord,
        "pushdown_read": _q_pushdown_read,
        "rank_sums": _q_rank_sums,
        "winsorized": _q_winsorized,
        "mad_outliers": _q_mad_outliers,
        "gini_order_value": _q_gini_order_value,
        "local_supplier_revenue": _q_local_supplier_revenue,
        "geohash_counts": _q_geohash_counts,
        "lm_quality_flags": _q_lm_quality_flags,
        "colocated_join": _q_colocated_join,
        "dbscan_cells": _q_dbscan_cells,
        "chi2_topwords": _q_chi2_topwords,
        "q6_revenue": _q_q6_revenue,
        "normalize_text_stats": _q_normalize_text_stats,
        "twap_value": _q_twap_value,
        "snapshot_diff": _q_snapshot_diff,
        "pq_ann_topk": _q_pq_ann_topk,
        "raster_smooth": _q_raster_smooth,
        "incremental_rollup": _q_incremental_rollup,
        "mann_whitney": _q_mann_whitney,
        "orders_profile": _q_orders_profile,
        "zorder_range_scan": _q_zorder_range_scan,
        "video_scenes": _q_video_scenes,
        "selfjoin_size": _q_selfjoin_size,
        "region_hulls": _q_region_hulls,
        "sssp_full": _q_sssp_full,
        "part_best_supplier": _q_part_best_supplier,
        "bottom_decile": _q_bottom_decile,
        "sssp_min_cost": _q_sssp_min_cost,
        "morans_i": _q_morans_i,
        "aspect_buckets": _q_aspect_buckets,
        "region_dissolve": _q_region_dissolve,
        "ohlc_daily": _q_ohlc_daily,
        "xcorr_lag": _q_xcorr_lag,
        "simpson_diversity": _q_simpson_diversity,
        "mann_kendall": _q_mann_kendall,
        "cusum_changepoint": _q_cusum_changepoint,
        "k_core": _q_k_core,
        "ewma_value": _q_ewma_value,
        "rfm_segments": _q_rfm_segments,
        "acf_table": _q_acf_table,
        "theil_sen": _q_theil_sen,
        "value_shape_stats": _q_value_shape_stats,
        "benford_digits": _q_benford_digits,
        "q10_returned": _q_q10_returned,
        "q15_top_supplier": _q_q15_top_supplier,
        "q17_small_qty": _q_q17_small_qty,
        "q19_disjunct": _q_q19_disjunct,
        "prefix_dup_docs": _q_prefix_dup_docs,
        "minmax_scaled": _q_minmax_scaled,
        "dim_stats": _q_dim_stats,
        "degree_assortativity": _q_degree_assortativity,
        "user_record_high": _q_user_record_high,
        "sequence_ngrams": _q_sequence_ngrams,
        "setsim_orders": _q_setsim_orders,
        "boilerplate_ngrams": _q_boilerplate_ngrams,
        "mkt_share": _q_mkt_share,
        "quantile_normalize": _q_quantile_normalize,
        "longest_streak": _q_longest_streak,
        "table_checksums": _q_table_checksums,
        "debounce_events": _q_debounce_events,
        "order_skyline": _q_order_skyline,
        "brand_wavg_price": _q_brand_wavg_price,
        "type_users_hll": _q_type_users_hll,
        "cell_adjacency": _q_cell_adjacency,
        "hive_partition_roundtrip": _q_hive_partition_roundtrip,
        "q12_linestatus": _q_q12_linestatus,
        "above_avg_orders": _q_above_avg_orders,
        "dup_rate_by_source": _q_dup_rate_by_source,
        "rolling_median": _q_rolling_median,
        "power_users_division": _q_power_users_division,
        "next_purchase": _q_next_purchase,
        "value_drift": _q_value_drift,
        "paa_symbols": _q_paa_symbols,
        "seasonal_naive_error": _q_seasonal_naive_error,
        "source_vocab_overlap": _q_source_vocab_overlap,
        "word_freq_cm": _q_word_freq_cm,
        "fk_violations": _q_fk_violations,
        "priority_percent_rank": _q_priority_percent_rank,
        "target_encode_type": _q_target_encode_type,
        "bloom_filter_fpr": _q_bloom_filter_fpr,
        "zscore_normalize": _q_zscore_normalize,
        "ngram_novelty": _q_ngram_novelty,
        "regr2_price": _q_regr2_price,
        "bounce_rate": _q_bounce_rate,
        "survival_hazard": _q_survival_hazard,
        "decile_gains": _q_decile_gains,
        "ab_test_ztest": _q_ab_test_ztest,
        "nearest_purchase": _q_nearest_purchase,
        "zorder_locality": _q_zorder_locality,
        "region_simplify_stats": _q_region_simplify_stats,
        "crossmodal_dup_clusters": _q_crossmodal_dup_clusters,
        "semivariogram": _q_semivariogram,
        "ripley_k": _q_ripley_k,
    }


# md5-u64 in SQL: int(md5(x)[:16], 16)
def _sql_md5u64(x: str) -> str:
    return f"CAST(concat('0x', substr(md5({x}), 1, 16)) AS UBIGINT)"


# SQL mirror of the md5-LSH shingle chain (dedup.py _md5_windows /
# minhash_md5_batch): word-3-gram windows joined by chr(31), short docs
# one whole-text window, one md5 per window + 16 affine permutations
# (wrapping uint64 arithmetic; constants shared with dedup.py),
# 4 bands of 4.
def _minhash_perm_values() -> str:
    from engine.ops.dedup import MINHASH_MD5_A, MINHASH_MD5_B

    rows = []
    for p in range(len(MINHASH_MD5_A)):
        a = int(MINHASH_MD5_A[p])
        rows.append(f"({p}, {a & 0xFFFFFFFF}, {a >> 32}, "
                    f"{int(MINHASH_MD5_B[p])})")
    return ", ".join(rows)


_MINHASH_BASE_SQL = f"""
    ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    wins AS (
      SELECT doc_id, unnest(CASE WHEN len(w) >= 3
          THEN list_transform(range(1, len(w) - 1),
                              i -> array_to_string(w[i:i+2], chr(31)))
          ELSE [array_to_string(w, chr(31))] END) AS win
      FROM ws
    ),
    dwin AS (SELECT DISTINCT doc_id, win FROM wins),
    bwin AS (SELECT doc_id, win, {_sql_md5u64('win')} AS base FROM dwin),
    perms(p, a_lo, a_hi, b) AS (VALUES {_minhash_perm_values()}),
    sigs AS (
      SELECT doc_id, p,
             min(CAST((
               (CAST(base AS HUGEINT) * a_lo
                + ((CAST(base AS HUGEINT) * a_hi) % 4294967296) * 4294967296
                + b)
               % 18446744073709551616) AS UBIGINT)) AS sig
      FROM bwin, perms GROUP BY doc_id, p
    ),
    bands AS (
      SELECT doc_id, (p // 4) AS band,
             {_sql_md5u64("concat(CAST(p // 4 AS VARCHAR), ':', string_agg(CAST(sig AS VARCHAR), ',' ORDER BY p))")} AS bucket
      FROM sigs GROUP BY doc_id, p // 4
    ),
    lsh_pairs AS (
      SELECT x.doc_id AS a, y.doc_id AS b, x.band
      FROM bands x JOIN bands y
        ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id
    )
"""

_MINHASH_PAIRS_SQL = f"""
    WITH {_MINHASH_BASE_SQL}
    SELECT a, b, CAST(count(*) AS BIGINT) AS n_bands
    FROM lsh_pairs GROUP BY a, b
"""

_MINHASH_VERIFIED_SQL = f"""
    WITH {_MINHASH_BASE_SQL},
    dcount AS (SELECT doc_id, count(*) AS n FROM dwin GROUP BY doc_id),
    cand AS (SELECT DISTINCT a, b FROM lsh_pairs),
    inter AS (
      SELECT c.a, c.b, count(*) AS i
      FROM cand c
      JOIN dwin wa ON wa.doc_id = c.a
      JOIN dwin wb ON wb.doc_id = c.b AND wb.win = wa.win
      GROUP BY c.a, c.b
    )
    SELECT t.a, t.b
    FROM inter t
    JOIN dcount na ON na.doc_id = t.a
    JOIN dcount nb ON nb.doc_id = t.b
    WHERE CAST(t.i AS DOUBLE) / (na.n + nb.n - t.i) >= 0.5
"""

# SQL mirror of the md5-token SimHash (dedup.py simhash_md5_batch):
# 64-bit fingerprint from per-bit ±1 sums over ALL tokens (dups kept),
# 8 bands × 8 bits, exact Hamming ≤ 7 (pigeonhole ⇒ exact pair set)
_SIMHASH_PAIRS_SQL = f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    th AS (SELECT doc_id, {_sql_md5u64('tok')} AS h FROM toks),
    bitsum AS (
      SELECT doc_id, b.range AS bit,
             SUM(CASE WHEN (h >> CAST(b.range AS UBIGINT)) & 1 = 1
                 THEN 1 ELSE -1 END) AS cnt
      FROM th, range(64) b GROUP BY doc_id, b.range
    ),
    sbands AS (
      SELECT doc_id, bit // 8 AS band,
             CAST(SUM(CASE WHEN cnt > 0 THEN 1 << (bit % 8) ELSE 0 END) AS BIGINT) AS val
      FROM bitsum GROUP BY doc_id, bit // 8
    ),
    cand AS (
      SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
      FROM sbands x JOIN sbands y
        ON x.band = y.band AND x.val = y.val AND x.doc_id < y.doc_id
    ),
    ham AS (
      SELECT c.a, c.b, CAST(SUM(bit_count(xor(xa.val, xb.val))) AS BIGINT) AS hamming
      FROM cand c
      JOIN sbands xa ON xa.doc_id = c.a
      JOIN sbands xb ON xb.doc_id = c.b AND xb.band = xa.band
      GROUP BY c.a, c.b
    )
    SELECT a, b, hamming FROM ham WHERE hamming <= 7
"""


# exact top-k cosine over 3 query vectors — the oracle for the
# exhaustive-probe LSH/IVF queries (both provably equal exact top-k)
_ANN_TOPK_SQL_3Q = """
    WITH q AS (
        SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
        FROM embeddings WHERE vec_id < 3
    ),
    v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings),
    s AS (
        SELECT query_id, vec_id, list_cosine_similarity(qe, ve) AS sim
        FROM q CROSS JOIN v WHERE vec_id <> query_id
    ),
    r AS (
        SELECT query_id, vec_id,
               row_number() OVER (
                   PARTITION BY query_id ORDER BY round(sim, 6) DESC, vec_id
               ) AS rank
        FROM s
    )
    SELECT query_id, vec_id, CAST(rank AS BIGINT) AS rank FROM r WHERE rank <= 10
"""


def _sql_mul64(a: str, lo: int, hi: int) -> str:
    """Wrapping uint64 multiply ``a * (hi<<32 | lo)`` in DuckDB: HUGEINT
    intermediates (≤2^97) split around the 32-bit halves of the constant."""
    return (
        f"CAST(((CAST({a} AS HUGEINT) * {lo})"
        f" + ((CAST({a} AS HUGEINT) * {hi}) % 4294967296) * 4294967296)"
        f" % 18446744073709551616 AS UBIGINT)"
    )


# Bit-exact SQL mirror of the decode→resize→featurize chain
# (engine/rayds/imgstage.py ResizeExtract + engine/img/codec.py synth):
# seed = md5 top-32 of image_id; SplitMix64 pixel streams via wrapping
# uint64 arithmetic; qraw = 6-bit mid-rise quantizer; feature = integer
# grayscale sum (299R+587G+114B) over the 16×16 NN thumbnail.
_IMG_FEATURES_SQL = f"""
    WITH imgs AS (
      SELECT 'img' || CAST(event_id AS VARCHAR) AS image_id,
             CAST(32 + (event_id % 4) * 16 AS BIGINT) AS w,
             CAST(32 + (event_id % 3) * 16 AS BIGINT) AS h,
             CASE WHEN event_id % 2 = 0 THEN 'raw'
                  WHEN event_id % 4 = 1 THEN 'qraw' ELSE 'png' END AS fmt,
             CAST(concat('0x', substr(md5('img' || CAST(event_id AS VARCHAR)), 1, 8)) AS UBIGINT) AS seed
      FROM events
    ),
    grid AS (
      SELECT image_id, w, h, fmt, seed, c.range AS c,
             (ty.range * h) // 16 AS ys, (tx.range * w) // 16 AS xs
      FROM imgs, range(16) ty, range(16) tx, range(3) c
    ),
    s0 AS (
      SELECT image_id, fmt, c,
             CAST(least((ys*4)//h,3)*12 + least((xs*4)//w,3)*3 + c AS UBIGINT) + seed AS bi,
             CAST(ys*w + xs AS UBIGINT) + xor(seed, CAST(1515870810 AS UBIGINT)) AS ni
      FROM grid
    ),
    s1 AS (SELECT image_id, fmt, c, {_sql_mul64('bi', 0x7F4A7C15, 0x9E3779B9)} AS b1,
                                    {_sql_mul64('ni', 0x7F4A7C15, 0x9E3779B9)} AS n1 FROM s0),
    s2 AS (SELECT image_id, fmt, c, xor(b1, b1 >> 31) AS b2, xor(n1, n1 >> 31) AS n2 FROM s1),
    s3 AS (SELECT image_id, fmt, c, {_sql_mul64('b2', 0x1CE4E5B9, 0xBF58476D)} AS b3,
                                    {_sql_mul64('n2', 0x1CE4E5B9, 0xBF58476D)} AS n3 FROM s2),
    s4 AS (SELECT image_id, fmt, c,
                  CAST(xor(b3, b3 >> 27) % 224 AS BIGINT) + CAST(xor(n3, n3 >> 27) % 32 AS BIGINT) AS p
           FROM s3),
    dec AS (
      SELECT image_id, c,
             CASE WHEN fmt='qraw' THEN ((p >> 2) << 2) + 2 ELSE p END AS v
      FROM s4
    )
    SELECT image_id,
           CAST(SUM(v * CASE c WHEN 0 THEN 299 WHEN 1 THEN 587 ELSE 114 END) AS BIGINT) AS thumb_gray_sum
    FROM dec GROUP BY image_id
"""


def oracle_sql() -> dict[str, str]:
    sql = {
        "ripley_k": f"""
            WITH {_IMGS},
            pts AS (
                SELECT CAST(substr(image_id, 4) AS BIGINT) AS id, x, y,
                       CAST(floor(x / 2.0) AS BIGINT) AS cx,
                       CAST(floor(y / 2.0) AS BIGINT) AS cy
                FROM imgs),
            offs(dx, dy) AS (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),
                                    (0,1),(1,-1),(1,0),(1,1)),
            rep AS (SELECT id, x, y, cx + dx AS gx, cy + dy AS gy
                    FROM pts, offs),
            pairs AS (
                SELECT sqrt((a.x - b.x) * (a.x - b.x)
                            + (a.y - b.y) * (a.y - b.y)) AS d
                FROM pts a JOIN rep b
                  ON a.cx = b.gx AND a.cy = b.gy AND a.id < b.id),
            bc AS (SELECT least(CAST(floor(d / 0.25) AS BIGINT), 7) AS b,
                          COUNT(*) AS c
                   FROM pairs WHERE d <= 2.0 GROUP BY 1),
            bins(b) AS (VALUES (0),(1),(2),(3),(4),(5),(6),(7)),
            n AS (SELECT COUNT(*) AS np FROM imgs),
            cc AS (SELECT CAST(bins.b AS BIGINT) AS bin,
                          CAST(SUM(COALESCE(bc.c, 0)) OVER
                               (ORDER BY bins.b) AS BIGINT) AS cum_pairs
                   FROM bins LEFT JOIN bc ON bins.b = bc.b)
            SELECT bin, cum_pairs,
                   10000.0 * 2.0 * cum_pairs / (np * (np - 1.0)) AS k_hat
            FROM cc, n ORDER BY bin
        """,
        "semivariogram": f"""
            WITH {_IMGS},
            pts AS (
                SELECT CAST(substr(image_id, 4) AS BIGINT) AS id, x, y,
                       CAST(32 + (CAST(substr(image_id, 4) AS BIGINT)
                                  % 4) * 16 AS BIGINT) AS v,
                       CAST(floor(x / 2.0) AS BIGINT) AS cx,
                       CAST(floor(y / 2.0) AS BIGINT) AS cy
                FROM imgs),
            offs(dx, dy) AS (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),
                                    (0,1),(1,-1),(1,0),(1,1)),
            rep AS (SELECT id, x, y, v, cx + dx AS gx, cy + dy AS gy
                    FROM pts, offs),
            pairs AS (
                SELECT a.v - b.v AS dv,
                       sqrt((a.x - b.x) * (a.x - b.x)
                            + (a.y - b.y) * (a.y - b.y)) AS d
                FROM pts a JOIN rep b
                  ON a.cx = b.gx AND a.cy = b.gy AND a.id < b.id)
            SELECT least(CAST(floor(d / 0.25) AS BIGINT), 7) AS bin,
                   COUNT(*) AS n_pairs,
                   CAST(SUM(dv * dv) AS DOUBLE) / (2.0 * COUNT(*))
                       AS gamma
            FROM pairs WHERE d <= 2.0
            GROUP BY 1 ORDER BY 1
        """,
        "cell_counts": f"""
            WITH {_IMGS}
            SELECT CAST(floor(x / 5.0) AS BIGINT) * 1048576
                   + CAST(floor(y / 5.0) AS BIGINT) AS cell,
                   count(*) AS n_images
            FROM imgs GROUP BY 1
        """,
        "join_covers": f"""
            WITH {_IMGS}, {_LAYER}
            SELECT image_id, poly_id FROM imgs JOIN layer ON {_COVERS}
        """,
        "join_contains": f"""
            WITH {_IMGS}, {_LAYER}
            SELECT image_id, poly_id FROM imgs JOIN layer ON {_CONTAINS}
        """,
        "tile_assign": f"""
            WITH {_IMGS}, {_LAYER}
            SELECT image_id, poly_id, {_TILE} AS tile_id
            FROM imgs JOIN layer ON {_COVERS}
        """,
        "tile_counts": f"""
            WITH {_IMGS}, {_LAYER}
            SELECT poly_id, {_TILE} AS tile_id, count(*) AS n_images
            FROM imgs JOIN layer ON {_COVERS}
            GROUP BY 1, 2
        """,
        "stratified_sample": """
            WITH r AS (
                SELECT event_type, event_id,
                       row_number() OVER (
                           PARTITION BY event_type
                           ORDER BY md5(CAST(event_id AS VARCHAR)), event_id
                       ) AS rn
                FROM events
            )
            SELECT event_type, event_id FROM r WHERE rn <= 50
        """,
        "sample_images": f"""
            WITH {_IMGS}
            SELECT image_id, x, y FROM imgs
            WHERE substr(md5(image_id), 1, 1) < '4'
        """,
        "lang_topwords": """
            WITH s AS (
                SELECT text,
                  (length(text) - length(replace(text, ' the ', ''))) / 5
                + (length(text) - length(replace(text, ' and ', ''))) / 5
                + (length(text) - length(replace(text, ' is ', '')))  / 4 AS s_en,
                  (length(text) - length(replace(text, ' el ', '')))  / 4
                + (length(text) - length(replace(text, ' la ', '')))  / 4
                + (length(text) - length(replace(text, ' que ', ''))) / 5 AS s_es,
                  (length(text) - length(replace(text, ' der ', ''))) / 5
                + (length(text) - length(replace(text, ' und ', ''))) / 5
                + (length(text) - length(replace(text, ' die ', ''))) / 5 AS s_de,
                  (length(text) - length(replace(text, ' le ', '')))  / 4
                + (length(text) - length(replace(text, ' et ', '')))  / 4
                + (length(text) - length(replace(text, ' les ', ''))) / 5 AS s_fr
                FROM documents
            ),
            lab AS (
                SELECT text, CASE
                    WHEN greatest(s_en, s_es, s_de, s_fr) = 0 THEN 'und'
                    WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
                    WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
                    WHEN s_de >= s_fr THEN 'de'
                    ELSE 'fr' END AS lang
                FROM s
            ),
            w AS (
                SELECT lang, unnest(string_split(text, ' ')) AS word FROM lab
            ),
            c AS (SELECT lang, word, count(*) AS cnt FROM w GROUP BY 1, 2),
            r AS (
                SELECT lang, word, cnt,
                       row_number() OVER (
                           PARTITION BY lang ORDER BY cnt DESC, word
                       ) AS rn
                FROM c
            )
            SELECT lang, word, cnt FROM r WHERE rn <= 5
        """,
        "tile_region_vectors": f"""
            WITH {_IMGS}, {_LAYER},
            t AS (
                SELECT poly_id, {_TILE} AS tile_id, count(*) AS n_images
                FROM imgs JOIN layer ON {_COVERS}
                GROUP BY 1, 2
            ),
            m AS (SELECT poly_id, avg(n_images) AS mu FROM t GROUP BY 1),
            lit AS (
                SELECT t.poly_id, t.tile_id FROM t
                JOIN m ON t.poly_id = m.poly_id
                WHERE t.n_images >= 0.9 * m.mu
            ),
            adj AS (
                SELECT a.poly_id, count(*) AS shared2
                FROM lit a JOIN lit b ON a.poly_id = b.poly_id AND (
                    (abs(a.tile_id % 4 - b.tile_id % 4) = 1
                     AND a.tile_id // 4 = b.tile_id // 4)
                    OR (abs(a.tile_id // 4 - b.tile_id // 4) = 1
                        AND a.tile_id % 4 = b.tile_id % 4))
                GROUP BY 1
            )
            SELECT lit.poly_id AS poly_id, count(*) AS n_lit,
                   4 * count(*) - coalesce(max(adj.shared2), 0) AS boundary_edges
            FROM lit LEFT JOIN adj ON lit.poly_id = adj.poly_id
            GROUP BY 1
        """,
        "dwithin_pairs": f"""
            WITH {_IMGS}, {_LAYER}
            SELECT image_id, poly_id FROM imgs CROSS JOIN layer WHERE {_DW}
        """,
        "knn_centers": f"""
            WITH {_IMGS}, {_LAYER},
            s AS (
                SELECT image_id, poly_id,
                       (x - (xmin + xmax) / 2) * (x - (xmin + xmax) / 2)
                     + (y - (ymin + ymax) / 2) * (y - (ymin + ymax) / 2) AS d2
                FROM imgs CROSS JOIN layer
            ),
            r AS (
                SELECT image_id, poly_id,
                       row_number() OVER (PARTITION BY image_id ORDER BY d2, poly_id) AS rn
                FROM s
            )
            SELECT image_id, poly_id FROM r WHERE rn = 1
        """,
        "total_bounds": f"""
            WITH {_IMGS}
            SELECT min(x) AS xmin, max(x) AS xmax, min(y) AS ymin, max(y) AS ymax
            FROM imgs
        """,
        "layer_measures": f"""
            WITH {_LAYER}
            SELECT poly_id,
                   (xmax - xmin) * (ymax - ymin) AS area,
                   2 * ((xmax - xmin) + (ymax - ymin)) AS perimeter
            FROM layer
        """,
        "semi_join": f"""
            WITH {_IMGS}, {_LAYER}
            SELECT DISTINCT image_id FROM imgs JOIN layer ON {_COVERS}
        """,
        "anti_join": f"""
            WITH {_IMGS}, {_LAYER}
            SELECT image_id FROM imgs i
            WHERE NOT EXISTS (
                SELECT 1 FROM layer l
                WHERE i.x >= l.xmin AND i.x <= l.xmax
                  AND i.y >= l.ymin AND i.y <= l.ymax
            )
        """,
        "join_covers_cellpart": f"""
            WITH {_IMGS}, {_LAYER}
            SELECT image_id, poly_id FROM imgs JOIN layer ON {_COVERS}
        """,
        "join_covers_s2part": f"""
            WITH {_IMGS}, {_LAYER}
            SELECT image_id, poly_id FROM imgs JOIN layer ON {_COVERS}
        """,
        "join_covers_hexpart": f"""
            WITH {_IMGS}, {_LAYER}
            SELECT image_id, poly_id FROM imgs JOIN layer ON {_COVERS}
        """,
        "join_covers_h3part": f"""
            WITH {_IMGS}, {_LAYER}
            SELECT image_id, poly_id FROM imgs JOIN layer ON {_COVERS}
        """,
        "join_overlaps_range": f"""
            WITH {_IMGS}, {_LAYER},
            boxes AS (
                SELECT image_id,
                       x - (32 + (event_id % 4) * 16) / 512.0 AS ixmin,
                       y - (32 + (event_id % 4) * 16) / 512.0 AS iymin,
                       x + (32 + (event_id % 4) * 16) / 512.0 AS ixmax,
                       y + (32 + (event_id % 4) * 16) / 512.0 AS iymax
                FROM events
                JOIN imgs ON imgs.image_id = 'img' || CAST(event_id AS VARCHAR)
            )
            SELECT image_id, poly_id
            FROM boxes JOIN layer
              ON ixmin <= xmax AND ixmax >= xmin
             AND iymin <= ymax AND iymax >= ymin
        """,
        "window_agg": """
            SELECT CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) AS win,
                   event_type,
                   count(*) AS n_events,
                   CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
            FROM events GROUP BY 1, 2
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT)
                       AS sum_qty,
                   CAST(sum(CAST(floor(l_extendedprice * 100.0) AS BIGINT))
                        AS BIGINT) AS sum_base_cents,
                   CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount)
                                       * 10000.0) AS BIGINT)) AS BIGINT)
                       AS sum_disc_bp,
                   CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount)
                                       * (1.0 + l_tax) * 1000000.0)
                                 AS BIGINT)) AS BIGINT) AS sum_charge_6,
                   count(*) AS count_order
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "cust_urgent": """
            SELECT c_mktsegment,
                   count(*) AS n_rows,
                   CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_unmatched
            FROM customer LEFT JOIN
                 (SELECT o_custkey, o_orderkey FROM orders
                  WHERE o_orderpriority = '1-URGENT') o
              ON o.o_custkey = c_custkey
            GROUP BY c_mktsegment
        """,
        "order_revenue": """
            SELECT o_orderpriority,
                   CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount)
                                       * 10000.0) AS BIGINT)) AS BIGINT)
                       AS revenue_bp,
                   count(*) AS n_items
            FROM orders JOIN lineitem ON l_orderkey = o_orderkey
            GROUP BY o_orderpriority
        """,
        "rasterize_cover": f"""
            WITH {_LAYER},
            gx AS (SELECT unnest(range(0, 20)) AS cx),
            gy AS (SELECT unnest(range(0, 20)) AS cy)
            SELECT poly_id, CAST(cx AS BIGINT) AS cell_x,
                   CAST(cy AS BIGINT) AS cell_y,
                   (least(xmax, (cx + 1) * 5.0) - greatest(xmin, cx * 5.0)) *
                   (least(ymax, (cy + 1) * 5.0) - greatest(ymin, cy * 5.0))
                       AS cover_area
            FROM layer, gx, gy
            WHERE least(xmax, (cx + 1) * 5.0) > greatest(xmin, cx * 5.0)
              AND least(ymax, (cy + 1) * 5.0) > greatest(ymin, cy * 5.0)
        """,
        "value_quantiles": """
            WITH e AS (SELECT event_type,
                              CAST(floor(value * 100) AS BIGINT) AS c
                       FROM events)
            SELECT event_type, 0.25 AS q,
                   CAST(quantile_disc(c, 0.25) AS BIGINT) AS cents FROM e GROUP BY 1
            UNION ALL
            SELECT event_type, 0.5, CAST(quantile_disc(c, 0.5) AS BIGINT) FROM e GROUP BY 1
            UNION ALL
            SELECT event_type, 0.75, CAST(quantile_disc(c, 0.75) AS BIGINT) FROM e GROUP BY 1
            UNION ALL
            SELECT event_type, 0.95, CAST(quantile_disc(c, 0.95) AS BIGINT) FROM e GROUP BY 1
        """,
        "distinct_users": """
            SELECT event_type, count(DISTINCT user_id) AS n_distinct
            FROM events GROUP BY event_type
        """,
        "session_agg": """
            WITH e AS (
                SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us,
                       CAST(floor(value * 100) AS BIGINT) AS cents
                FROM events
            ), marked AS (
                SELECT *,
                       CASE WHEN LAG(ts_us) OVER w IS NULL
                                 OR ts_us - LAG(ts_us) OVER w > 1800000000
                            THEN 1 ELSE 0 END AS new_s
                FROM e
                WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)
            ), sess AS (
                SELECT *,
                       SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts_us
                                        ROWS UNBOUNDED PRECEDING) AS sid
                FROM marked
            )
            SELECT user_id,
                   MIN(ts_us) AS session_start_us,
                   count(*) AS n_events,
                   CAST(sum(cents) AS BIGINT) AS sum_cents
            FROM sess GROUP BY user_id, sid
        """,
        "asof_click_view": """
            WITH l AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
                 r AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'),
                 m AS (
                     SELECT l.event_id AS event_id, l.user_id, max(r.ts) AS mts
                     FROM l JOIN r ON r.user_id = l.user_id AND r.ts <= l.ts
                     GROUP BY 1, 2
                 )
            SELECT m.event_id, r.event_id AS match_id
            FROM m JOIN r ON r.user_id = m.user_id AND r.ts = m.mts
        """,
        "tile_mosaics": f"""
            WITH {_IMGS}, {_LAYER},
            counts AS (
                SELECT poly_id, {_TILE} AS tile_id, count(*) AS n_images
                FROM imgs JOIN layer ON {_COVERS}
                GROUP BY 1, 2
            )
            SELECT poly_id, tile_id, n_images,
                   CAST(least(8, CAST(ceil(sqrt(n_images)) AS BIGINT)) * 8 AS INTEGER) AS mosaic_w,
                   CAST(least(8, CAST(ceil(sqrt(n_images)) AS BIGINT)) * 8 AS INTEGER) AS mosaic_h
            FROM counts
        """,
        "wkb_roundtrip": f"""
            WITH {_IMGS}
            SELECT image_id, x, y FROM imgs
        """,
        "wkbz_roundtrip": f"""
            WITH {_IMGS}
            SELECT image_id, x, y, (x + y) / 2.0 AS z FROM imgs
        """,
        "affine_bounds": f"""
            WITH {_IMGS}
            SELECT min(x + 10.5) AS xmin, max(x + 10.5) AS xmax,
                   min(y * 2.0) AS ymin, max(y * 2.0) AS ymax
            FROM imgs
        """,
        "tile_clip_area": f"""
            WITH {_LAYER},
            tiles AS (
                SELECT poly_id,
                       CAST(ty * 4 + tx AS BIGINT) AS tile_id,
                       xmin + tx * (side / 4) AS txmin,
                       ymin + ty * (side / 4) AS tymin,
                       xmin + (tx + 1) * (side / 4) AS txmax,
                       ymin + (ty + 1) * (side / 4) AS tymax
                FROM layer
                CROSS JOIN (SELECT unnest(range(4)) AS tx)
                CROSS JOIN (SELECT unnest(range(4)) AS ty)
            )
            SELECT poly_id, tile_id,
                   greatest(0, least(txmax, 60.0) - greatest(txmin, 10.0))
                   * greatest(0, least(tymax, 60.0) - greatest(tymin, 10.0)) AS clip_area
            FROM tiles
        """,
        "token_stats": r"""
            SELECT doc_id,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                   CAST(len(regexp_extract_all(text,
                        '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+')) AS BIGINT)
                       AS n_bpe_tokens,
                   CAST(length(text) AS BIGINT) AS n_chars_calc
            FROM documents
        """,
        "word_topk": """
            SELECT word, count(*) AS cnt
            FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
            GROUP BY word ORDER BY cnt DESC, word LIMIT 20
        """,
        "dedup_exact": """
            SELECT substr(text, 1, 16) AS key16,
                   min(doc_id) AS doc_id,
                   count(*) AS n_copies
            FROM documents GROUP BY 1
        """,
        # exhaustive-probe LSH/IVF == exact top-k (see the query
        # docstrings); 3 query vectors instead of ann_topk's 5
        "ann_topk_lsh": _ANN_TOPK_SQL_3Q,
        "ann_topk_ivf": _ANN_TOPK_SQL_3Q,
        "img_features": _IMG_FEATURES_SQL,
        "minhash_pairs": _MINHASH_PAIRS_SQL,
        "minhash_verified": _MINHASH_VERIFIED_SQL,
        "simhash_pairs": _SIMHASH_PAIRS_SQL,
        "ann_topk": """
            WITH q AS (
                SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
                FROM embeddings WHERE vec_id < 5
            ),
            v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings),
            s AS (
                SELECT query_id, vec_id, list_cosine_similarity(qe, ve) AS sim
                FROM q CROSS JOIN v WHERE vec_id <> query_id
            ),
            r AS (
                SELECT query_id, vec_id,
                       row_number() OVER (
                           PARTITION BY query_id ORDER BY round(sim, 6) DESC, vec_id
                       ) AS rank
                FROM s
            )
            SELECT query_id, vec_id, CAST(rank AS BIGINT) AS rank FROM r WHERE rank <= 10
        """,
        "embed_dedup": """
            WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
            SELECT a.vec_id AS a, b.vec_id AS b
            FROM v a JOIN v b ON a.vec_id < b.vec_id
            WHERE round(list_cosine_similarity(a.e, b.e), 6) >= 0.4
        """,
        "lang_quality": """
            WITH m AS (
                SELECT
                  (length(text) - length(replace(text, ' the ', ''))) / 5
                + (length(text) - length(replace(text, ' and ', ''))) / 5
                + (length(text) - length(replace(text, ' is ', '')))  / 4 AS s_en,
                  (length(text) - length(replace(text, ' el ', '')))  / 4
                + (length(text) - length(replace(text, ' la ', '')))  / 4
                + (length(text) - length(replace(text, ' que ', ''))) / 5 AS s_es,
                  (length(text) - length(replace(text, ' der ', ''))) / 5
                + (length(text) - length(replace(text, ' und ', ''))) / 5
                + (length(text) - length(replace(text, ' die ', ''))) / 5 AS s_de,
                  (length(text) - length(replace(text, ' le ', '')))  / 4
                + (length(text) - length(replace(text, ' et ', '')))  / 4
                + (length(text) - length(replace(text, ' les ', ''))) / 5 AS s_fr
                FROM documents
            ),
            lab AS (
                SELECT CASE
                    WHEN greatest(s_en, s_es, s_de, s_fr) = 0 THEN 'und'
                    WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
                    WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
                    WHEN s_de >= s_fr THEN 'de'
                    ELSE 'fr' END AS pred_lang
                FROM m
            )
            SELECT pred_lang, count(*) AS n_docs FROM lab GROUP BY 1
        """,
        "doc_fingerprint": """
            SELECT doc_id, substr(md5(text), 1, 16) AS fp_hex FROM documents
        """,
        "dedup_clusters": """
            WITH RECURSIVE ej AS (
            WITH w AS (
                SELECT doc_id, string_split(text, ' ') AS ws FROM documents
            ), sh AS (
                SELECT doc_id,
                       CASE WHEN len(ws) >= 3
                            THEN list_distinct(list_transform(
                                 generate_series(1, len(ws) - 2),
                                 i -> ws[i] || chr(1) || ws[i+1] || chr(1) || ws[i+2]))
                            ELSE [array_to_string(ws, chr(1))]
                       END AS s
                FROM w
            )
            SELECT a.doc_id AS a, b.doc_id AS b,
                   CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                     / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
                     AS jaccard
            FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1
        ),
            e1 AS (SELECT a, b FROM ej WHERE jaccard >= 0.01),
            e2 AS (SELECT a, b FROM e1 UNION ALL SELECT b, a FROM e1),
            nodes AS (SELECT DISTINCT a AS n FROM e2),
            reach(src, dst) AS (
                SELECT n, n FROM nodes
                UNION
                SELECT r.src, e.b FROM reach r JOIN e2 e ON e.a = r.dst
            )
            SELECT src AS doc_id, min(dst) AS cluster_id
            FROM reach GROUP BY src
        """,
        "ngram_jaccard": """
            WITH w AS (
                SELECT doc_id, string_split(text, ' ') AS ws FROM documents
            ), sh AS (
                SELECT doc_id,
                       CASE WHEN len(ws) >= 3
                            THEN list_distinct(list_transform(
                                 generate_series(1, len(ws) - 2),
                                 i -> ws[i] || chr(1) || ws[i+1] || chr(1) || ws[i+2]))
                            ELSE [array_to_string(ws, chr(1))]
                       END AS s
                FROM w
            )
            SELECT a.doc_id AS a, b.doc_id AS b,
                   CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                     / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
                     AS jaccard
            FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1
        """,
        "psnr_validate": f"""
            WITH {_IMGS}
            SELECT image_id, true AS psnr_ok FROM imgs
        """,
        "video_frames": """
            SELECT 'img' || CAST(event_id AS VARCHAR) AS image_id,
                   CAST(f AS BIGINT) AS frame_idx
            FROM events
            CROSS JOIN (SELECT unnest(range(0, 9)) AS f)
            WHERE f % 3 = 0 AND f < 4 + event_id % 5
        """,
        # exact integer-moment correlation: HUGEINT sums are exact, and
        # the double expression mirrors stats.pearson_from_moments term
        # by term (one rounding per CAST, IEEE sqrt/·// correctly
        # rounded) → bit-identical doubles
        "corr_qty_price": """
            WITH m AS (
              SELECT CAST(count(*) AS HUGEINT) n,
                     sum(CAST(l_quantity AS HUGEINT)) sx,
                     sum(CAST(round(l_extendedprice*100) AS HUGEINT)) sy,
                     sum(CAST(l_quantity AS HUGEINT)
                         * CAST(l_quantity AS HUGEINT)) sxx,
                     sum(CAST(round(l_extendedprice*100) AS HUGEINT)
                         * CAST(round(l_extendedprice*100) AS HUGEINT)) syy,
                     sum(CAST(l_quantity AS HUGEINT)
                         * CAST(round(l_extendedprice*100) AS HUGEINT)) sxy
              FROM lineitem)
            SELECT CAST(n AS BIGINT) AS n,
                   CAST(n*sxy - sx*sy AS DOUBLE)
                   / (sqrt(CAST(n*sxx - sx*sx AS DOUBLE))
                      * sqrt(CAST(n*syy - sy*sy AS DOUBLE))) AS corr
            FROM m
        """,
        # exact-integer moments per group, then ONE fixed evaluation
        # order for the doubles — term-for-term the same roundings as
        # engine.ops.stats.grouped_regression (NOT DuckDB's built-in
        # regr_*, which accumulates running floats)
        "regr_price_qty": """
            WITH m AS (
              SELECT l_returnflag,
                     CAST(count(*) AS HUGEINT) n,
                     sum(CAST(l_quantity AS HUGEINT)) sx,
                     sum(CAST(round(l_extendedprice*100) AS HUGEINT)) sy,
                     sum(CAST(l_quantity AS HUGEINT)
                         * CAST(l_quantity AS HUGEINT)) sxx,
                     sum(CAST(round(l_extendedprice*100) AS HUGEINT)
                         * CAST(round(l_extendedprice*100) AS HUGEINT)) syy,
                     sum(CAST(l_quantity AS HUGEINT)
                         * CAST(round(l_extendedprice*100) AS HUGEINT)) sxy
              FROM lineitem GROUP BY 1),
            s AS (
              SELECT l_returnflag, n,
                     CAST(n*sxy - sx*sy AS DOUBLE) AS num,
                     CAST(n*sxx - sx*sx AS DOUBLE) AS vx,
                     CAST(n*syy - sy*sy AS DOUBLE) AS vy,
                     CAST(sx AS DOUBLE) AS dx, CAST(sy AS DOUBLE) AS dy,
                     CAST(n*sxy - sx*sy AS DOUBLE)
                     / CAST(n*sxx - sx*sx AS DOUBLE) AS slope
              FROM m)
            SELECT l_returnflag, CAST(n AS BIGINT) AS n, slope,
                   (dy - slope*dx) / CAST(n AS DOUBLE) AS intercept,
                   num / (sqrt(vx) * sqrt(vy)) AS r
            FROM s
        """,
        "median_value": """
            SELECT quantile_disc(value, 0.5) AS med FROM events
        """,
        "value_percentiles": """
            SELECT quantile_cont(value, 0.25) AS p25,
                   quantile_cont(value, 0.5)  AS p50,
                   quantile_cont(value, 0.9)  AS p90
            FROM events
        """,
        "mode_user": """
            WITH c AS (
                SELECT event_type, user_id, count(*) AS n
                FROM events GROUP BY 1, 2
            ), r AS (
                SELECT c.*, row_number() OVER (
                    PARTITION BY event_type ORDER BY n DESC, user_id
                ) AS rn FROM c
            )
            SELECT event_type, user_id AS mode_user, n FROM r WHERE rn = 1
        """,
        "latest_event": """
            WITH r AS (
                SELECT user_id, ts, event_id, event_type, value,
                       row_number() OVER (
                           PARTITION BY user_id
                           ORDER BY ts DESC, event_id DESC
                       ) AS rn
                FROM events
            )
            SELECT user_id, ts, event_id, event_type, value
            FROM r WHERE rn = 1
        """,
        # word-5-gram contamination screen: single-space tokenization
        # (string_split mirrors contam._doc_ngram_bytes' contract);
        # n-grams are substrings so array_to_string == the engine's
        # buffer-sliced bytes
        "contamination": """
            WITH w AS (
                SELECT doc_id, source, string_split(text, ' ') AS ws
                FROM documents
            ), g AS (
                SELECT doc_id, source,
                       unnest(list_distinct(list_transform(
                           generate_series(1, len(ws) - 4),
                           i -> array_to_string(ws[i:i+4], ' ')))) AS ng
                FROM w WHERE len(ws) >= 5
            ), bench AS (
                SELECT DISTINCT ng FROM g WHERE source = 'src0'
            )
            SELECT g.doc_id, CAST(count(DISTINCT g.ng) AS BIGINT) AS n_hits
            FROM g JOIN bench USING (ng)
            WHERE g.source <> 'src0'
            GROUP BY 1
        """,
        # 2-D skyline via the windowed formulation (O(n log n), same
        # result set as the NOT-EXISTS dominance definition): dominated
        # ⇔ strictly-higher-price prefix min-date ≤ own, or own price
        # group's min-date < own
        "pareto_orders": """
            WITH g AS (
                SELECT o_totalprice AS p, min(o_orderdate) AS gmin
                FROM orders GROUP BY 1
            ), gg AS (
                SELECT p, gmin, min(gmin) OVER (
                    ORDER BY p DESC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS m1
                FROM g
            )
            SELECT o.o_orderkey, o.o_totalprice, o.o_orderdate
            FROM orders o JOIN gg ON o.o_totalprice = gg.p
            WHERE (m1 IS NULL OR m1 > o.o_orderdate)
              AND gmin = o.o_orderdate
        """,
        # contingency residuals: float-first product mirrors
        # stats.crosstab_residuals (int64 rt·ct would overflow at scale)
        "crosstab_hours": """
            WITH c AS (
                SELECT event_type,
                       CAST((epoch_us(ts) // 3600000000) % 24 AS BIGINT)
                           AS hr,
                       count(*) AS o
                FROM events GROUP BY 1, 2
            ), t AS (
                SELECT c.*, sum(o) OVER (PARTITION BY event_type) AS rt,
                       sum(o) OVER (PARTITION BY hr) AS ct,
                       sum(o) OVER () AS n
                FROM c
            )
            SELECT event_type, hr, o,
                   CAST(rt AS DOUBLE) * ct / n AS expected,
                   (o - CAST(rt AS DOUBLE) * ct / n)
                       / sqrt(CAST(rt AS DOUBLE) * ct / n) AS resid
            FROM t
        """,
        # trajectory: exact squared-integer distances; ordering ties
        # broken by event_id on both sides
        "trajectory_stats": """
            WITH pts AS (
                SELECT user_id, ts, event_id,
                       (event_id * 9973) % 100000 AS ix,
                       (event_id * 7919) % 100000 AS iy
                FROM events
            ), w AS (
                SELECT user_id, ix, iy,
                       lag(ix) OVER o AS px, lag(iy) OVER o AS py,
                       first_value(ix) OVER o AS fx,
                       first_value(iy) OVER o AS fy,
                       last_value(ix) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED
                           PRECEDING AND UNBOUNDED FOLLOWING) AS lx,
                       last_value(iy) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED
                           PRECEDING AND UNBOUNDED FOLLOWING) AS ly
                FROM pts
                WINDOW o AS (PARTITION BY user_id ORDER BY ts, event_id)
            )
            SELECT user_id, count(*) AS n_points,
                   CAST(COALESCE(sum((ix - px) * (ix - px)
                                     + (iy - py) * (iy - py)), 0)
                        AS BIGINT) AS path_d2,
                   max((lx - fx) * (lx - fx)
                       + (ly - fy) * (ly - fy)) AS net_d2
            FROM w GROUP BY 1
        """,
        # per-group quantile_cont: h=(n-1)q, lower*(1-frac)+upper*frac
        # in the identical double expression order
        "grouped_percentiles": """
            SELECT event_type, 0.25 AS q,
                   quantile_cont(value, 0.25) AS value
            FROM events GROUP BY 1
            UNION ALL
            SELECT event_type, 0.5 AS q,
                   quantile_cont(value, 0.5) AS value
            FROM events GROUP BY 1
            UNION ALL
            SELECT event_type, 0.9 AS q,
                   quantile_cont(value, 0.9) AS value
            FROM events GROUP BY 1
        """,
        # one float expression (x·64/100 in this exact IEEE order) at
        # the finest zoom; every coarser level is integer halving of it
        # (floor(floor(a)/2) == floor(a/2)) — identical on both sides
        "tile_pyramid": f"""
            WITH {_IMGS}, base AS (
                SELECT CAST(floor(x * 64.0 / 100.0) AS BIGINT) AS cx,
                       CAST(floor(y * 64.0 / 100.0) AS BIGINT) AS cy
                FROM imgs
            )
            SELECT CAST(z AS BIGINT) AS z, cx >> (6 - z) AS qx,
                   cy >> (6 - z) AS qy, count(*) AS n
            FROM base CROSS JOIN (SELECT unnest([0,1,2,3,4,5,6]) AS z)
            GROUP BY 1, 2, 3
        """,
        # RE2 on both sides: identical non-overlapping left-to-right
        # global replace spans
        "pii_redact": rf"""
            SELECT doc_id,
                   regexp_replace(text, '{_PII_RE}', '<PII>', 'g')
                       AS redacted,
                   len(regexp_extract_all(text, '{_PII_RE}'))
                       AS n_redacted
            FROM documents
        """,
        # lexicographic 2-hex-char compare of md5's first byte = the
        # engine's weighted_mix_mask threshold, bit-for-bit
        "mix_sources": """
            SELECT doc_id, source FROM documents
            WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <
                CASE source WHEN 'src0' THEN '40'
                            WHEN 'src1' THEN '80'
                            WHEN 'src2' THEN 'c0'
                            ELSE 'ff' END
        """,
        # list_distinct mirrors the dictionary-encode distinct count;
        # the ratio is one fixed float expression over exact ints
        "doc_dup_stats": """
            SELECT doc_id,
                   len(string_split(text, ' ')) AS n_tokens,
                   len(list_distinct(string_split(text, ' ')))
                       AS n_distinct,
                   CAST(len(string_split(text, ' '))
                        - len(list_distinct(string_split(text, ' ')))
                        AS DOUBLE)
                       / len(string_split(text, ' ')) AS dup_ratio
            FROM documents
        """,
        # exact kNN join: d2 is evaluated in the same IEEE order on both
        # sides; ties broken by (d2, rid) everywhere
        "knn_join": """
            WITH p AS (
                SELECT event_id AS id,
                       ((event_id * 9973) % 100000) / 1000.0 AS x,
                       ((event_id * 7919) % 100000) / 1000.0 AS y
                FROM events
            ), s AS (
                SELECT a.id AS lid, b.id AS rid,
                       (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) AS d2
                FROM p a JOIN p b ON b.id <> a.id
                WHERE a.id % 20 = 0
            ), r AS (
                SELECT s.*, row_number() OVER (
                    PARTITION BY lid ORDER BY d2, rid) AS rn
                FROM s
            )
            SELECT lid, rid, CAST(rn AS BIGINT) AS nn_rank, d2
            FROM r WHERE rn <= 4
        """,
        "funnel_steps": """
            WITH s1 AS (
                SELECT user_id, min(ts) AS t1 FROM events
                WHERE event_type = 'signup' GROUP BY 1
            ), s2 AS (
                SELECT e.user_id, min(e.ts) AS t2 FROM events e
                JOIN s1 USING (user_id)
                WHERE e.event_type = 'purchase' AND e.ts > s1.t1 GROUP BY 1
            ), s3 AS (
                SELECT e.user_id, min(e.ts) AS t3 FROM events e
                JOIN s2 USING (user_id)
                WHERE e.event_type = 'error' AND e.ts > s2.t2 GROUP BY 1
            )
            SELECT CAST(1 AS BIGINT) AS step, count(*) AS users FROM s1
            UNION ALL SELECT 2, count(*) FROM s2
            UNION ALL SELECT 3, count(*) FROM s3
        """,
        # minhash_pairs / simhash_pairs / minhash_verified / ann_topk_lsh /
        # img_features: non-SQL-expressible (LSH candidate generation,
        # image codec) — rows-only check per the driver contract; their
        # semantics are pinned by pytest recall/parity tests instead.
    }
    # the skew-proof split plans compute the SAME result as their
    # co-partitioned originals — they share the originals' oracle SQL
    sql["session_agg_split"] = sql["session_agg"]
    sql["asof_split"] = sql["asof_click_view"]
    # cc_iterative's chain graph has closed-form components (no
    # recursive CTE needed): every node n = event_id*16+k belongs to the
    # chain starting at (n // 128) * 128
    sql["cc_iterative"] = """
        WITH ks AS (SELECT unnest(range(16)) AS k),
             nodes AS (SELECT event_id * 16 + k AS n FROM events CROSS JOIN ks)
        SELECT CAST(n AS BIGINT) AS doc_id,
               CAST((n // 128) * 128 AS BIGINT) AS cluster_id
        FROM nodes
    """
    # BM25 (rational idf): every float expression mirrors the numpy
    # evaluation ORDER in engine/ops/text.py bit-for-bit (constants are
    # written as the same sums/products, never pre-folded — 1.2 + 1.0 is
    # NOT the double literal 2.2)
    sql["bm25_topk"] = """
        WITH st AS (
            SELECT count(*) AS n,
                   sum(len(string_split(text, ' '))) AS tok,
                   sum(CASE WHEN len(list_filter(string_split(text, ' '),
                        x -> x = 'the')) > 0 THEN 1 ELSE 0 END) AS df0,
                   sum(CASE WHEN len(list_filter(string_split(text, ' '),
                        x -> x = 'join')) > 0 THEN 1 ELSE 0 END) AS df1,
                   sum(CASE WHEN len(list_filter(string_split(text, ' '),
                        x -> x = 'window')) > 0 THEN 1 ELSE 0 END) AS df2
            FROM documents
        ),
        tf AS (
            SELECT doc_id,
                   CAST(len(string_split(text, ' ')) AS DOUBLE) AS dl,
                   CAST(len(list_filter(string_split(text, ' '),
                        x -> x = 'the')) AS DOUBLE) AS tf0,
                   CAST(len(list_filter(string_split(text, ' '),
                        x -> x = 'join')) AS DOUBLE) AS tf1,
                   CAST(len(list_filter(string_split(text, ' '),
                        x -> x = 'window')) AS DOUBLE) AS tf2
            FROM documents
        ),
        sc AS (
            SELECT doc_id,
              ((st.n - st.df0 + 0.5) / (st.df0 + 0.5)) * (tf0 * (1.2 + 1.0))
                / (tf0 + 1.2 * (1.0 - 0.75 + 0.75 * (dl / (CAST(st.tok AS DOUBLE) / st.n))))
            + ((st.n - st.df1 + 0.5) / (st.df1 + 0.5)) * (tf1 * (1.2 + 1.0))
                / (tf1 + 1.2 * (1.0 - 0.75 + 0.75 * (dl / (CAST(st.tok AS DOUBLE) / st.n))))
            + ((st.n - st.df2 + 0.5) / (st.df2 + 0.5)) * (tf2 * (1.2 + 1.0))
                / (tf2 + 1.2 * (1.0 - 0.75 + 0.75 * (dl / (CAST(st.tok AS DOUBLE) / st.n))))
              AS score
            FROM tf, st
        )
        SELECT doc_id, score FROM sc ORDER BY score DESC, doc_id LIMIT 20
    """
    # Z-order: the same magic-number dilation chain as
    # engine/ops/zorder.py, over the exact integer coordinate grid
    # (event_id*MULT mod 100000 == rint(x*1000) — the float roundtrip is
    # exact below 2^52)
    sql["zorder_top100"] = """
        WITH q AS (
            SELECT 'img' || CAST(event_id AS VARCHAR) AS image_id,
                   (event_id * 9973) % 100000 AS x,
                   (event_id * 7919) % 100000 AS y
            FROM events
        ),
        s1 AS (SELECT image_id, (x | (x << 16)) & 281470681808895 AS x,
                      (y | (y << 16)) & 281470681808895 AS y FROM q),
        s2 AS (SELECT image_id, (x | (x << 8)) & 71777214294589695 AS x,
                      (y | (y << 8)) & 71777214294589695 AS y FROM s1),
        s3 AS (SELECT image_id, (x | (x << 4)) & 1085102592571150095 AS x,
                      (y | (y << 4)) & 1085102592571150095 AS y FROM s2),
        s4 AS (SELECT image_id, (x | (x << 2)) & 3689348814741910323 AS x,
                      (y | (y << 2)) & 3689348814741910323 AS y FROM s3),
        s5 AS (SELECT image_id, (x | (x << 1)) & 6148914691236517205 AS x,
                      (y | (y << 1)) & 6148914691236517205 AS y FROM s4)
        SELECT image_id, CAST(x | (y << 1) AS BIGINT) AS morton
        FROM s5 ORDER BY morton, image_id LIMIT 100
    """
    sql["heavy_hitters"] = """
        SELECT word, CAST(count(*) AS BIGINT) AS cnt
        FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        GROUP BY word ORDER BY cnt DESC, word LIMIT 10
    """
    sql["interval_join"] = """
        WITH l AS (
            SELECT event_id AS l_event, epoch_us(ts) AS l0,
                   epoch_us(ts) + 600000000 AS l1
            FROM events WHERE event_type = 'click'
        ),
        r AS (
            SELECT event_id AS r_event, epoch_us(ts) AS r0,
                   epoch_us(ts) + 420000000 AS r1
            FROM events WHERE event_type = 'error'
        )
        SELECT l_event, r_event FROM l JOIN r ON l0 <= r1 AND r0 <= l1
    """
    # dedup_canonical reuses dedup_clusters' recursive closure: keep every
    # doc that is not a non-canonical member of a cluster
    sql["dedup_canonical"] = sql["dedup_clusters"].replace(
        """SELECT src AS doc_id, min(dst) AS cluster_id
            FROM reach GROUP BY src""",
        """, clus AS (
                SELECT src AS doc_id, min(dst) AS cluster_id
                FROM reach GROUP BY src
            )
            SELECT d.doc_id FROM documents d
            WHERE d.doc_id NOT IN
                (SELECT doc_id FROM clus WHERE doc_id != cluster_id)""",
    )
    sql["rollup_counts"] = """
        SELECT COALESCE(event_type, '__all__') AS event_type,
               CAST(COALESCE((epoch_us(ts) // 3600000000) * 3600000000, -1)
                    AS BIGINT) AS hour_us,
               count(*) AS n
        FROM events
        GROUP BY GROUPING SETS (
            (event_type, (epoch_us(ts) // 3600000000) * 3600000000),
            (event_type), ()
        )
    """
    sql["region_revenue"] = """
        SELECT r_name,
               CAST(SUM(CAST(floor(l_extendedprice * (1.0 - l_discount)
                    * 10000.0) AS BIGINT)) AS BIGINT) AS revenue_bp
        FROM lineitem, orders, customer, nation, region
        WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
          AND c_nationkey = n_nationkey AND n_regionkey = r_regionkey
        GROUP BY r_name
    """
    sql["q3_topk"] = """
        SELECT o_orderkey AS l_orderkey,
               CAST(epoch_us(o_orderdate) AS BIGINT) AS o_date_us,
               CAST(SUM(CAST(floor(l_extendedprice * (1.0 - l_discount)
                    * 10000.0) AS BIGINT)) AS BIGINT) AS revenue_bp
        FROM customer, orders, lineitem
        WHERE c_mktsegment = 'BUILDING'
          AND c_custkey = o_custkey
          AND l_orderkey = o_orderkey
          AND epoch_us(o_orderdate) < 883612800000000
          AND epoch_us(l_shipdate) > 883612800000000
        GROUP BY 1, 2
        ORDER BY revenue_bp DESC, l_orderkey LIMIT 10
    """
    sql["lag_gap"] = """
        SELECT event_id,
               CAST(COALESCE(epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ), -1) AS BIGINT) AS gap_us
        FROM events
    """
    sql["hopping_window"] = """
        WITH offs AS (SELECT unnest([0, 1800000000]) AS off),
        w AS (
            SELECT ((epoch_us(ts) - off) // 3600000000) * 3600000000 + off
                       AS win_start_us,
                   event_type
            FROM events CROSS JOIN offs
        )
        SELECT win_start_us, event_type, count(*) AS n_events
        FROM w GROUP BY 1, 2
    """
    sql["pivot_user_events"] = """
        SELECT user_id,
               CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
               CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
               CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
               CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view
        FROM events GROUP BY user_id
    """
    sql["props_topk"] = """
        SELECT CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) AS k,
               count(*) AS cnt
        FROM events
        WHERE regexp_extract(props, '"k": ([0-9]+)', 1) != ''
        GROUP BY 1 ORDER BY cnt DESC, k LIMIT 20
    """
    sql["pack_sequences"] = """
        WITH t AS (
            SELECT doc_id,
                   CAST(length(text) - length(replace(text, ' ', '')) + 1
                        AS BIGINT) AS n_tokens
            FROM documents
        )
        SELECT doc_id, n_tokens,
               CAST(COALESCE(SUM(n_tokens) OVER (
                   ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS BIGINT) AS tok_offset,
               CAST(COALESCE(SUM(n_tokens) OVER (
                   ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) // 2048 AS BIGINT) AS seq_id
        FROM t
    """
    sql["time_window"] = """
        WITH e AS (
            SELECT event_id, user_id,
                   CAST(epoch_us(ts) AS BIGINT) AS ts_us,
                   CAST(floor(value * 100) AS BIGINT) AS cents
            FROM events
        )
        SELECT user_id, event_id,
               CAST(SUM(cents) OVER w AS BIGINT) AS win_sum,
               COUNT(*) OVER w AS win_n
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
                     RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """
    sql["markov_transitions"] = """
        WITH o AS (
            SELECT user_id, event_type,
                   lag(event_type) OVER (
                       PARTITION BY user_id
                       ORDER BY epoch_us(ts), event_id) AS prev
            FROM events
        )
        SELECT prev AS prev_type, event_type AS next_type,
               COUNT(*) AS n
        FROM o WHERE prev IS NOT NULL
        GROUP BY prev, event_type
    """
    sql["idf_vocab"] = """
        WITH d AS (
            SELECT doc_id,
                   unnest(list_distinct(string_split(text, ' '))) AS word
            FROM documents
        ), c AS (
            SELECT word, count(*) AS df FROM d GROUP BY 1
        ), n AS (SELECT count(*) AS nd FROM documents)
        SELECT word, df,
               (CAST(nd AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
               / (CAST(df AS DOUBLE) + 0.5) AS idf
        FROM c, n
    """
    sql["bigram_topk"] = """
        WITH s AS (SELECT string_split(text, ' ') AS ws FROM documents),
        b AS (
            SELECT ws[i] AS w1, ws[i + 1] AS w2
            FROM s, LATERAL (
                SELECT unnest(range(1, len(ws))) AS i) t
        )
        SELECT w1, w2, count(*) AS cnt FROM b
        GROUP BY 1, 2
        ORDER BY cnt DESC, w1, w2 LIMIT 20
    """
    sql["shuffle_positions"] = """
        SELECT doc_id,
               row_number() OVER (
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ) - 1 AS pos
        FROM documents
    """
    sql["user_running_total"] = """
        WITH e AS (
            SELECT event_id, user_id,
                   CAST(epoch_us(ts) AS BIGINT) AS ts_us,
                   CAST(round(value * 100) AS BIGINT) AS cents
            FROM events
        )
        SELECT user_id, event_id,
               CAST(SUM(cents) OVER (
                   PARTITION BY user_id ORDER BY ts_us, event_id
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running
        FROM e
    """
    sql["centroid_by_label"] = """
        WITH x AS (
            SELECT CAST(label AS BIGINT) AS label, i.i AS dim,
                   CAST(round(CAST(embedding[i.i + 1] AS DOUBLE)
                              * 1000000) AS BIGINT) AS mv
            FROM embeddings,
                 LATERAL (SELECT unnest(range(len(embedding))) AS i) i(i)
        )
        SELECT label, dim, CAST(sum(mv) AS BIGINT) AS s,
               count(*) AS n,
               CAST(sum(mv) AS DOUBLE) / CAST(count(*) AS DOUBLE)
               AS mean_micro
        FROM x GROUP BY 1, 2
    """
    sql["order_gap_hist"] = """
        WITH o AS (
            SELECT o_custkey,
                   CAST(epoch_us(o_orderdate) AS BIGINT) // 86400000000
                   AS day, o_orderkey
            FROM orders
        ), g AS (
            SELECT day - lag(day) OVER (
                PARTITION BY o_custkey ORDER BY day, o_orderkey) AS gap
            FROM o
        )
        SELECT gap AS gap_days, count(*) AS n
        FROM g WHERE gap IS NOT NULL GROUP BY 1
    """
    sql["monthly_growth"] = """
        WITH m AS (
            SELECT (year(o_orderdate) - 1970) * 12
                   + month(o_orderdate) - 1 AS month_idx,
                   CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS revenue_c
            FROM orders GROUP BY 1
        ), lagged AS (
            SELECT month_idx, revenue_c,
                   lag(revenue_c) OVER (ORDER BY month_idx) AS prev_c
            FROM m
        )
        SELECT month_idx, revenue_c, prev_c,
               revenue_c - prev_c AS delta_c,
               CAST(revenue_c - prev_c AS DOUBLE)
               / CAST(prev_c AS DOUBLE) AS pct
        FROM lagged WHERE prev_c IS NOT NULL
    """
    sql["value_histogram"] = """
        WITH s AS (SELECT min(value) AS mn, max(value) AS mx FROM events)
        SELECT LEAST(CAST(floor((value - mn) * 20.0 / (mx - mn))
                          AS BIGINT), 19) AS bucket,
               count(*) AS n
        FROM events, s GROUP BY 1
    """
    sql["first_touch"] = """
        WITH e AS (
            SELECT user_id, event_id, event_type,
                   CAST(epoch_us(ts) AS BIGINT) AS ts_us
            FROM events
        ), r AS (
            SELECT user_id, event_type, row_number() OVER (
                PARTITION BY user_id ORDER BY ts_us, event_id) AS rn
            FROM e
        ), f AS (
            SELECT user_id, event_type AS first_type FROM r WHERE rn = 1
        ), c AS (
            SELECT user_id,
                   max(CASE WHEN event_type = 'purchase'
                       THEN 1 ELSE 0 END) AS conv
            FROM e GROUP BY 1
        )
        SELECT first_type, count(*) AS n_users,
               CAST(sum(conv) AS BIGINT) AS n_converted
        FROM f JOIN c USING (user_id) GROUP BY 1
    """
    sql["cube_counts"] = """
        WITH e AS (
            SELECT event_type,
                   CAST((CAST(epoch_us(ts) AS BIGINT) // 86400000000
                         + 4) % 7 AS VARCHAR) AS wd
            FROM events
        )
        SELECT COALESCE(event_type, 'ALL') AS event_type,
               COALESCE(wd, 'ALL') AS weekday,
               count(*) AS n
        FROM e GROUP BY CUBE (event_type, wd)
    """
    sql["tfidf_topterms"] = """
        WITH w AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS word
            FROM documents
        ), tf AS (
            SELECT doc_id, word, count(*) AS tf FROM w GROUP BY 1, 2
        ), df AS (
            SELECT word, count(DISTINCT doc_id) AS df FROM w GROUP BY 1
        ), n AS (SELECT count(*) AS nd FROM documents),
        s AS (
            SELECT tf.doc_id, tf.word, tf.tf,
                   CAST(tf.tf AS DOUBLE)
                   * ((CAST(nd AS DOUBLE) - CAST(df.df AS DOUBLE) + 0.5)
                      / (CAST(df.df AS DOUBLE) + 0.5)) AS score
            FROM tf, df, n WHERE tf.word = df.word
        ), r AS (
            SELECT *, row_number() OVER (
                PARTITION BY doc_id ORDER BY score DESC, word) AS rank
            FROM s
        )
        SELECT doc_id, word, tf, score, rank FROM r WHERE rank <= 3
    """
    sql["followup_pairs"] = """
        WITH e AS (
            SELECT event_id, user_id, event_type,
                   CAST(epoch_us(ts) AS BIGINT) AS ts_us
            FROM events
        )
        SELECT a.event_type AS t1, b.event_type AS t2, count(*) AS n
        FROM e a JOIN e b ON a.user_id = b.user_id
         AND (b.ts_us > a.ts_us
              OR (b.ts_us = a.ts_us AND b.event_id > a.event_id))
         AND b.ts_us <= a.ts_us + 1800000000
        GROUP BY 1, 2
    """
    sql["part_order_hist"] = """
        WITH d AS (
            SELECT l_partkey, count(DISTINCT l_orderkey) AS n_orders
            FROM lineitem GROUP BY 1
        )
        SELECT n_orders, count(*) AS n_parts FROM d GROUP BY 1
    """
    sql["dau_wau"] = """
        WITH d AS (
            SELECT DISTINCT user_id,
                   CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS day
            FROM events
        ), dau AS (
            SELECT day, count(*) AS dau FROM d GROUP BY 1
        ), w AS (
            SELECT DISTINCT user_id, day // 7 AS week FROM d
        ), wau AS (
            SELECT week, count(*) AS wau FROM w GROUP BY 1
        )
        SELECT day, dau.dau, day // 7 AS week, wau.wau,
               CAST(dau.dau AS DOUBLE) / CAST(wau.wau AS DOUBLE)
               AS stickiness
        FROM dau JOIN wau ON day // 7 = wau.week
    """
    sql["anomaly_zscore"] = """
        WITH e AS (
            SELECT event_id, user_id,
                   CAST(round(value * 100) AS HUGEINT) AS c
            FROM events
        ), m AS (
            SELECT user_id, CAST(count(*) AS HUGEINT) AS n,
                   sum(c) AS sy, sum(c * c) AS syy
            FROM e GROUP BY 1
        )
        SELECT e.user_id, e.event_id, CAST(e.c AS BIGINT) AS cents
        FROM e JOIN m USING (user_id)
        WHERE (n * e.c - sy) * (n * e.c - sy) > 9 * (n * syy - sy * sy)
    """
    sql["cohort_retention"] = """
        WITH d AS (
            SELECT DISTINCT user_id,
                   CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS day
            FROM events
        ), f AS (
            SELECT user_id, min(day) AS cohort FROM d GROUP BY 1
        )
        SELECT f.cohort AS cohort_day, d.day - f.cohort AS offset_days,
               count(*) AS users
        FROM d JOIN f USING (user_id)
        GROUP BY 1, 2
    """
    sql["copurchase_topk"] = """
        WITH l AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
        SELECT a.l_partkey AS p1, b.l_partkey AS p2, count(*) AS cnt
        FROM l a JOIN l b ON a.l_orderkey = b.l_orderkey
                         AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
        ORDER BY cnt DESC, p1, p2 LIMIT 20
    """
    sql["big_orders"] = """
        WITH t AS (
            SELECT l_orderkey,
                   CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
                   AS total_qty
            FROM lineitem GROUP BY 1 HAVING total_qty > 180
        )
        SELECT c_name, o_custkey, o_orderkey,
               CAST(epoch_us(o_orderdate) AS BIGINT) AS o_date_us,
               total_qty
        FROM t, orders, customer
        WHERE t.l_orderkey = o_orderkey AND o_custkey = c_custkey
    """
    sql["nation_flow"] = """
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(SUM(CAST(floor(l_extendedprice * (1.0 - l_discount)
                    * 10000.0) AS BIGINT)) AS BIGINT) AS revenue_bp
        FROM lineitem, supplier, orders, customer,
             nation n1, nation n2
        WHERE l_suppkey = s_suppkey AND l_orderkey = o_orderkey
          AND o_custkey = c_custkey
          AND s_nationkey = n1.n_nationkey
          AND c_nationkey = n2.n_nationkey
          AND n1.n_nationkey <> n2.n_nationkey
        GROUP BY 1, 2
    """
    sql["rolling_value"] = """
        WITH e AS (
            SELECT event_id, user_id,
                   CAST(epoch_us(ts) AS BIGINT) AS ts_us,
                   CAST(floor(value * 100) AS BIGINT) AS cents
            FROM events
        )
        SELECT user_id, event_id,
               CAST(SUM(cents) OVER w AS BIGINT) AS roll_sum,
               COUNT(*) OVER w AS roll_n,
               CAST(SUM(cents) OVER w AS DOUBLE) / COUNT(*) OVER w
                   AS roll_avg
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
                     ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
    """
    sql["user_event_path"] = """
        SELECT user_id,
               string_agg(event_type, ',' ORDER BY epoch_us(ts), event_id)
                   AS path
        FROM events GROUP BY user_id
    """
    sql["common_paths"] = """
        WITH p AS (
            SELECT user_id,
                   string_agg(event_type, ','
                              ORDER BY epoch_us(ts), event_id) AS path
            FROM events GROUP BY user_id
        )
        SELECT path, count(*) AS n_users FROM p
        GROUP BY 1 ORDER BY n_users DESC, path LIMIT 10
    """
    sql["cell_density_stats"] = f"""
        WITH {_IMGS},
        c AS (
            SELECT CAST(floor(x / 5.0) AS BIGINT) * 1048576
                   + CAST(floor(y / 5.0) AS BIGINT) AS cell,
                   count(*) AS n
            FROM imgs GROUP BY 1
        )
        SELECT count(*) AS n_cells, min(n) AS min_n, max(n) AS max_n,
               CAST(sum(n) AS BIGINT) AS total,
               quantile_disc(n, 0.5) AS med_n
        FROM c
    """
    sql["curation_pipeline"] = """
        WITH m AS (
            SELECT doc_id, text,
              (length(text) - length(replace(text, ' the ', ''))) / 5
            + (length(text) - length(replace(text, ' and ', ''))) / 5
            + (length(text) - length(replace(text, ' is ', '')))  / 4 AS s_en,
              (length(text) - length(replace(text, ' el ', '')))  / 4
            + (length(text) - length(replace(text, ' la ', '')))  / 4
            + (length(text) - length(replace(text, ' que ', ''))) / 5 AS s_es,
              (length(text) - length(replace(text, ' der ', ''))) / 5
            + (length(text) - length(replace(text, ' und ', ''))) / 5
            + (length(text) - length(replace(text, ' die ', ''))) / 5 AS s_de,
              (length(text) - length(replace(text, ' le ', '')))  / 4
            + (length(text) - length(replace(text, ' et ', '')))  / 4
            + (length(text) - length(replace(text, ' les ', ''))) / 5 AS s_fr
            FROM documents
        ), en AS (
            SELECT doc_id, text,
                   length(text) - length(replace(text, ' ', '')) + 1
                       AS n_tokens,
                   length(regexp_replace(text, '[^0-9]', '', 'g'))
                       AS n_dig
            FROM m
            WHERE greatest(s_en, s_es, s_de, s_fr) > 0
              AND s_en >= s_es AND s_en >= s_de AND s_en >= s_fr
        ), kept AS (
            SELECT doc_id, n_tokens, substr(md5(text), 1, 16) AS fp
            FROM en
            WHERE n_tokens BETWEEN 5 AND 1000
              AND 5 * n_dig < length(text)
        )
        SELECT fp, min(doc_id) AS doc_id, min(n_tokens) AS n_tokens
        FROM kept GROUP BY fp
    """
    sql["region_top_customers"] = """
        WITH s AS (
            SELECT o_custkey,
                   CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS spend_c
            FROM orders GROUP BY 1
        ), l AS (
            SELECT r_name, o_custkey AS c_custkey, spend_c
            FROM s, customer, nation, region
            WHERE o_custkey = c_custkey AND c_nationkey = n_nationkey
              AND n_regionkey = r_regionkey
        ), r AS (
            SELECT *, row_number() OVER (
                PARTITION BY r_name
                ORDER BY spend_c DESC, c_custkey) AS rank
            FROM l
        )
        SELECT r_name, c_custkey, spend_c, rank FROM r WHERE rank <= 3
    """
    sql["brand_share"] = """
        WITH b AS (
            SELECT p_type, p_brand,
                   CAST(SUM(CAST(round(p_retailprice * 100) AS BIGINT))
                        AS BIGINT) AS brand_c
            FROM part GROUP BY 1, 2
        )
        SELECT p_type, p_brand, brand_c,
               CAST(SUM(brand_c) OVER (PARTITION BY p_type) AS BIGINT)
                   AS type_c,
               CAST(brand_c AS DOUBLE)
               / CAST(SUM(brand_c) OVER (PARTITION BY p_type) AS DOUBLE)
                   AS share
        FROM b
    """
    sql["lift_pairs"] = """
        WITH l AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        ab AS (
            SELECT a.l_partkey AS p1, b.l_partkey AS p2, count(*) AS n_ab
            FROM l a JOIN l b ON a.l_orderkey = b.l_orderkey
                             AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2 HAVING count(*) >= 3
        ),
        c AS (SELECT l_partkey, count(*) AS n FROM l GROUP BY 1),
        t AS (SELECT count(DISTINCT l_orderkey) AS nn FROM lineitem)
        SELECT p1, p2, n_ab,
               CAST(n_ab * nn AS DOUBLE)
               / CAST(ca.n * cb.n AS DOUBLE) AS lift
        FROM ab JOIN c ca ON p1 = ca.l_partkey
                JOIN c cb ON p2 = cb.l_partkey, t
        ORDER BY lift DESC, p1, p2 LIMIT 20
    """
    sql["triangle_count"] = """
        WITH raw AS (
            SELECT event_id % 499 AS a,
                   (event_id // 499 + event_id % 491) % 499 AS b
            FROM events
        ), e AS (
            SELECT DISTINCT LEAST(a, b) AS lo, GREATEST(a, b) AS hi
            FROM raw WHERE a <> b
        )
        SELECT COUNT(*) AS n_triangles
        FROM e e1
        JOIN e e2 ON e2.lo = e1.lo AND e2.hi > e1.hi
        JOIN e e3 ON e3.lo = e1.hi AND e3.hi = e2.hi
    """
    sql["value_ntile"] = """
        SELECT event_id, event_type,
               NTILE(4) OVER (PARTITION BY event_type
                              ORDER BY value, event_id) AS quartile
        FROM events
    """
    sql["lineitem_rank"] = """
        SELECT l_orderkey, l_quantity, l_linenumber,
               RANK() OVER w AS rnk,
               DENSE_RANK() OVER w AS drnk,
               PERCENT_RANK() OVER w AS prnk
        FROM lineitem
        WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_quantity)
    """
    sql["fuzzy_title_pairs"] = """
        WITH d AS (
            SELECT doc_id, substr(text, 1, 24) AS title FROM documents
        )
        SELECT x.doc_id AS a, y.doc_id AS b,
               levenshtein(x.title, y.title) AS editdist
        FROM d x JOIN d y
          ON x.doc_id < y.doc_id
         AND levenshtein(x.title, y.title) <= 1
    """
    sql["q4_priority"] = """
        SELECT o_orderpriority, count(*) AS n_orders
        FROM orders
        WHERE EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        GROUP BY 1
    """
    sql["cust_order_dist"] = """
        WITH c AS (
            SELECT c_custkey,
                   count(CASE WHEN o_orderpriority = '1-URGENT'
                              THEN 1 END) AS n_urgent
            FROM customer LEFT JOIN orders ON c_custkey = o_custkey
            GROUP BY 1
        )
        SELECT n_urgent, count(*) AS n_cust FROM c GROUP BY 1
    """
    sql["promo_share"] = """
        WITH w AS (
            SELECT CAST(floor(l_extendedprice * (1.0 - l_discount)
                        * 10000.0) AS BIGINT) AS bp,
                   p_type
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1996-04-01'
        )
        SELECT
            CAST(SUM(CASE WHEN p_type = 'PROMO' THEN bp ELSE 0 END)
                 AS BIGINT) AS promo_bp,
            CAST(SUM(bp) AS BIGINT) AS total_bp,
            CAST(SUM(CASE WHEN p_type = 'PROMO' THEN bp ELSE 0 END)
                 AS DOUBLE) / CAST(SUM(bp) AS DOUBLE) AS promo_share
        FROM w
    """
    sql["cust_no_urgent"] = """
        WITH cc AS (
            SELECT c_custkey, c_nationkey,
                   CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
            FROM customer
        ), s AS (
            SELECT CAST(SUM(bal_c) AS BIGINT) AS tot,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM cc WHERE bal_c > 0
        )
        SELECT c_nationkey, count(*) AS n_cust,
               CAST(SUM(bal_c) AS BIGINT) AS total_bal_c
        FROM cc, s
        WHERE bal_c * n > tot
          AND NOT EXISTS (
              SELECT 1 FROM orders
              WHERE o_custkey = c_custkey
                AND o_orderpriority = '1-URGENT')
        GROUP BY 1
    """
    sql["users_both_halves"] = """
        SELECT user_id FROM events
        WHERE ts < TIMESTAMP '2024-01-16'
        INTERSECT
        SELECT user_id FROM events
        WHERE ts >= TIMESTAMP '2024-01-16'
    """
    sql["bfs_hops4"] = """
        WITH raw AS (
            SELECT event_id % 499 AS x,
                   (event_id // 499 + event_id % 491) % 499 AS y
            FROM events
        ), e0 AS (
            SELECT DISTINCT x, y FROM raw WHERE x <> y
        ), ud AS (
            SELECT x AS a, y AS b FROM e0
            UNION
            SELECT y AS a, x AS b FROM e0
        ), h0 AS (SELECT CAST(0 AS BIGINT) AS node),
        h1 AS (SELECT DISTINCT ud.b AS node FROM ud, h0
               WHERE ud.a = h0.node),
        h2 AS (SELECT DISTINCT ud.b AS node FROM ud, h1
               WHERE ud.a = h1.node),
        h3 AS (SELECT DISTINCT ud.b AS node FROM ud, h2
               WHERE ud.a = h2.node),
        h4 AS (SELECT DISTINCT ud.b AS node FROM ud, h3
               WHERE ud.a = h3.node),
        lab AS (
            SELECT node, 0 AS hops FROM h0
            UNION ALL SELECT node, 1 FROM h1
            UNION ALL SELECT node, 2 FROM h2
            UNION ALL SELECT node, 3 FROM h3
            UNION ALL SELECT node, 4 FROM h4
        )
        SELECT node, CAST(min(hops) AS BIGINT) AS hops
        FROM lab GROUP BY 1
    """
    sql["user_active_time"] = """
        WITH iv AS (
            SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS s FROM events
        ), m AS (
            SELECT user_id, s,
                   CASE WHEN lag(s) OVER w IS NULL
                             OR s > lag(s) OVER w + 900000000
                        THEN 1 ELSE 0 END AS brk
            FROM iv WINDOW w AS (PARTITION BY user_id ORDER BY s)
        ), g AS (
            SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY s
                                     ROWS UNBOUNDED PRECEDING) AS grp
            FROM m
        ), mg AS (
            SELECT user_id, grp,
                   max(s) + 900000000 - min(s) AS len
            FROM g GROUP BY 1, 2
        )
        SELECT user_id, CAST(SUM(len) AS BIGINT) AS active_us
        FROM mg GROUP BY 1
    """
    sql["click_nobuy_days"] = """
        SELECT user_id,
               CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
        FROM events WHERE event_type = 'click'
        EXCEPT
        SELECT user_id,
               CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
        FROM events WHERE event_type = 'purchase'
    """
    sql["calendar_fill"] = """
        WITH b AS (
            SELECT CAST(min(epoch_us(ts) // 86400000000) AS BIGINT) AS lo,
                   CAST(max(epoch_us(ts) // 86400000000) AS BIGINT) AS hi
            FROM events
        ), spine AS (
            SELECT unnest(generate_series(lo, hi)) AS day FROM b
        ), c AS (
            SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
                   count(*) AS n
            FROM events WHERE value > 300.0 GROUP BY 1
        )
        SELECT spine.day, CAST(COALESCE(c.n, 0) AS BIGINT) AS n_events
        FROM spine LEFT JOIN c USING (day)
    """
    sql["locf_value"] = """
        WITH e AS (
            SELECT event_id, user_id,
                   CAST(epoch_us(ts) AS BIGINT) AS ts_us,
                   CASE WHEN event_type = 'error' THEN NULL
                        ELSE value END AS v
            FROM events
        )
        SELECT event_id, user_id,
               COALESCE(last_value(v IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts_us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                   -1.0) AS filled_value
        FROM e
    """
    sql["csv_roundtrip"] = """
        SELECT l_returnflag,
               CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
                   AS sum_qty
        FROM lineitem GROUP BY 1
    """
    sql["train_val_split"] = """
        WITH s AS (
            SELECT CASE
                     WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc'
                       THEN 'train'
                     WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
                       THEN 'val'
                     ELSE 'test'
                   END AS split,
                   n_chars
            FROM documents
        )
        SELECT split, count(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM s GROUP BY 1
    """
    sql["nearest_poly"] = f"""
        WITH {_IMGS}, {_LAYER},
        d AS (
            SELECT image_id, poly_id,
                   greatest(xmin - x, x - xmax, 0)
                   * greatest(xmin - x, x - xmax, 0)
                 + greatest(ymin - y, y - ymax, 0)
                   * greatest(ymin - y, y - ymax, 0) AS d2
            FROM imgs CROSS JOIN layer
        ), r AS (
            SELECT *, row_number() OVER (
                PARTITION BY image_id ORDER BY d2, poly_id) AS rn
            FROM d
        )
        SELECT image_id, poly_id, d2 FROM r WHERE rn = 1
    """
    sql["open_orders_daily"] = """
        WITH o AS (
            SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT)
                   AS sd
            FROM orders
        ), b AS (
            SELECT min(sd) AS lo, max(sd) + 30 AS hi FROM o
        ), spine AS (
            SELECT unnest(generate_series(lo, hi - 1)) AS day FROM b
        )
        SELECT spine.day,
               CAST(count(o.sd) AS BIGINT) AS n_open
        FROM spine LEFT JOIN o
          ON spine.day >= o.sd AND spine.day < o.sd + 30
        GROUP BY 1
    """
    sql["feature_hash_counts"] = """
        WITH w AS (
            SELECT unnest(string_split(text, ' ')) AS word FROM documents
        )
        SELECT substr(md5(word), 1, 2) AS bucket,
               count(*) AS n_tokens
        FROM w GROUP BY 1
    """
    sql["ann_range"] = """
        WITH v AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
            FROM embeddings
        ), q AS (SELECT * FROM v WHERE vec_id < 8)
        SELECT q.vec_id AS qid, v.vec_id AS vec_id
        FROM q JOIN v ON v.vec_id <> q.vec_id
        WHERE round(list_cosine_similarity(q.e, v.e), 6) >= 0.3
    """
    sql["session_quantiles"] = """
        WITH e AS (
            SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us
            FROM events
        ), marked AS (
            SELECT *,
                   CASE WHEN LAG(ts_us) OVER w IS NULL
                             OR ts_us - LAG(ts_us) OVER w > 1800000000
                        THEN 1 ELSE 0 END AS new_s
            FROM e
            WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)
        ), sess AS (
            SELECT *,
                   SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts_us
                                    ROWS UNBOUNDED PRECEDING) AS sid
            FROM marked
        ), d AS (
            SELECT CAST(max(ts_us) - min(ts_us) AS DOUBLE) AS dur
            FROM sess GROUP BY user_id, sid
        )
        SELECT count(*) AS n_sessions,
               quantile_cont(dur, 0.5) AS p50_dur,
               quantile_cont(dur, 0.9) AS p90_dur
        FROM d
    """
    sql["selfjoin_size"] = """
        WITH c AS (
            SELECT user_id, count(*) AS c FROM events GROUP BY 1
        )
        SELECT count(*) AS n_users,
               CAST(sum(CAST(c AS HUGEINT) * CAST(c AS HUGEINT))
                    AS BIGINT) AS selfjoin_rows
        FROM c
    """
    sql["zorder_range_scan"] = f"""
        WITH {_IMGS}
        SELECT count(*) AS n_points,
               CAST(sum(CAST(round(x * 1000) AS BIGINT)) AS BIGINT)
                   AS sum_x_milli
        FROM imgs
        WHERE x >= 22.3 AND x <= 61.7 AND y >= 10.0 AND y <= 45.5
    """
    sql["mann_whitney"] = """
        WITH t AS (
            SELECT event_type,
                   CAST(floor(value * 100) AS BIGINT) AS c
            FROM events WHERE event_type IN ('click', 'purchase')
        ), r AS (
            SELECT event_type,
                   2 * (count(*) OVER (ORDER BY c
                                       RANGE UNBOUNDED PRECEDING))
                     - (count(*) OVER (PARTITION BY c)) + 1 AS r2
            FROM t
        ), g AS (
            SELECT event_type, count(*) AS n_g,
                   CAST(sum(r2) AS BIGINT) AS s
            FROM r GROUP BY 1
        )
        SELECT (SELECT n_g FROM g WHERE event_type = 'click') AS n_click,
               (SELECT n_g FROM g WHERE event_type = 'purchase')
                   AS n_purchase,
               (SELECT s - n_g * (n_g + 1) FROM g
                WHERE event_type = 'click') AS u2_click,
               (SELECT s - n_g * (n_g + 1) FROM g
                WHERE event_type = 'purchase') AS u2_purchase
    """
    sql["orders_profile"] = """
        SELECT count(*) AS n_rows,
               CAST(sum(CASE WHEN o_custkey IS NULL
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_null_cust,
               CAST(min(epoch_us(o_orderdate)) AS BIGINT) AS min_date_us,
               CAST(max(epoch_us(o_orderdate)) AS BIGINT) AS max_date_us,
               CAST(min(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS min_cents,
               CAST(max(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS max_cents,
               CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS n_status
        FROM orders
    """
    sql["raster_smooth"] = f"""
        WITH {_IMGS},
        cells AS (
            SELECT CAST(floor(x / 5.0) AS BIGINT) AS cx,
                   CAST(floor(y / 5.0) AS BIGINT) AS cy,
                   count(*) AS n
            FROM imgs GROUP BY 1, 2
        )
        SELECT i.cx, i.cy, i.n,
               CAST(sum(j.n) AS BIGINT) AS focal_sum
        FROM cells i JOIN cells j
          ON abs(i.cx - j.cx) <= 1 AND abs(i.cy - j.cy) <= 1
        GROUP BY 1, 2, 3
    """
    sql["incremental_rollup"] = """
        SELECT event_type, count(*) AS n,
               CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
                   AS sum_cents
        FROM events GROUP BY 1
    """
    sql["twap_value"] = """
        WITH e AS (
            SELECT user_id, epoch_us(ts) // 1000000 AS ts_s, event_id,
                   CAST(floor(value * 100) AS BIGINT) AS cents
            FROM events
        ), w AS (
            SELECT user_id, cents,
                   LEAD(ts_s) OVER (PARTITION BY user_id
                                    ORDER BY ts_s, event_id) - ts_s AS dt
            FROM e
        ), agg AS (
            SELECT user_id,
                   CAST(sum(CASE WHEN dt IS NULL THEN 0
                                 ELSE cents * dt END) AS BIGINT) AS num,
                   CAST(sum(CASE WHEN dt IS NULL THEN 0
                                 ELSE dt END) AS BIGINT) AS span
            FROM w GROUP BY 1
        )
        SELECT user_id, CAST(num AS DOUBLE) / CAST(span AS DOUBLE) AS twap
        FROM agg WHERE span > 0
    """
    sql["snapshot_diff"] = """
        WITH a AS (
            SELECT event_id,
                   CAST(floor(value * 100) AS BIGINT) AS v
            FROM events
        ), b AS (
            SELECT event_id,
                   CASE WHEN event_id % 7 = 0 THEN v + 100 ELSE v END AS v
            FROM a WHERE event_id % 11 <> 0
        ), f AS (
            SELECT a.v AS av, b.v AS bv
            FROM a FULL OUTER JOIN b ON a.event_id = b.event_id
        )
        SELECT CASE WHEN av IS NULL THEN 'added'
                    WHEN bv IS NULL THEN 'removed'
                    WHEN av <> bv THEN 'changed'
                    ELSE 'same' END AS status,
               count(*) AS n
        FROM f GROUP BY 1
    """
    sql["chi2_topwords"] = """
        WITH w AS (
            SELECT lang, doc_id,
                   unnest(string_split(text, ' ')) AS word
            FROM documents
        ), dw AS (SELECT DISTINCT lang, doc_id, word FROM w),
        a AS (SELECT lang, word, count(*) AS a_cnt FROM dw GROUP BY 1, 2),
        nl AS (SELECT lang, count(*) AS n_lang FROM documents GROUP BY 1),
        nn AS (SELECT count(*) AS n FROM documents),
        wc AS (SELECT word, sum(a_cnt) AS w_cnt FROM a GROUP BY 1),
        sc AS (
            SELECT a.lang, a.word,
                   CAST(a.a_cnt AS BIGINT) AS a_,
                   CAST(nl.n_lang - a.a_cnt AS BIGINT) AS b_,
                   CAST(wc.w_cnt - a.a_cnt AS BIGINT) AS c_,
                   CAST((nn.n - nl.n_lang)
                        - (wc.w_cnt - a.a_cnt) AS BIGINT) AS d_,
                   CAST(nn.n AS BIGINT) AS n
            FROM a JOIN nl USING (lang) JOIN wc USING (word)
            CROSS JOIN nn
        ), x AS (
            SELECT lang, word,
                   (CAST(n AS DOUBLE)
                    * CAST(a_ * d_ - b_ * c_ AS DOUBLE)
                    * CAST(a_ * d_ - b_ * c_ AS DOUBLE))
                   / (CAST(a_ + b_ AS DOUBLE) * CAST(c_ + d_ AS DOUBLE)
                      * CAST(a_ + c_ AS DOUBLE)
                      * CAST(b_ + d_ AS DOUBLE)) AS chi2
            FROM sc
        ), r AS (
            SELECT lang, word, chi2,
                   row_number() OVER (PARTITION BY lang
                                      ORDER BY chi2 DESC, word) AS rn
            FROM x
        )
        SELECT lang, word, chi2 FROM r WHERE rn <= 5
    """
    sql["q6_revenue"] = """
        SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                        * CAST(round(l_discount * 100) AS BIGINT))
                    AS BIGINT) AS revenue_bp,
               count(*) AS n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
          AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
          AND l_quantity < 24
    """
    sql["normalize_text_stats"] = r"""
        SELECT lang, count(*) AS n_docs,
               CAST(sum(length(text)) AS BIGINT) AS chars_before,
               CAST(sum(length(trim(regexp_replace(
                   lower(text), '\s+', ' ', 'g')))) AS BIGINT)
                   AS chars_after
        FROM documents GROUP BY 1
    """
    sql["colocated_join"] = """
        SELECT o_orderpriority, count(*) AS n,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS sum_cents
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        GROUP BY 1
    """
    sql["dbscan_cells"] = f"""
        WITH RECURSIVE {_IMGS},
        cells AS (
            SELECT CAST(floor(x / 5.0) AS BIGINT) AS cx,
                   CAST(floor(y / 5.0) AS BIGINT) AS cy,
                   count(*) AS n
            FROM imgs GROUP BY 1, 2
        ), g AS (
            SELECT CAST(count(*) AS BIGINT) AS nc,
                   CAST(sum(n) AS BIGINT) AS s
            FROM cells
        ), dense AS (
            SELECT cx, cy, n, cx * 2048 + cy AS id
            FROM cells, g WHERE n * nc >= s
        ), e1 AS (
            SELECT i.id AS a, j.id AS b
            FROM dense i JOIN dense j
              ON abs(i.cx - j.cx) + abs(i.cy - j.cy) = 1
        ), reach(src, dst) AS (
            SELECT id, id FROM dense
            UNION
            SELECT r.src, e.b FROM reach r JOIN e1 e ON e.a = r.dst
        ), comp AS (
            SELECT src AS id, min(dst) AS root FROM reach GROUP BY 1
        )
        SELECT root AS cluster_id, count(*) AS n_cells,
               CAST(sum(n) AS BIGINT) AS n_points
        FROM comp JOIN dense USING (id) GROUP BY 1
    """
    sql["geohash_counts"] = f"""
        WITH {_IMGS},
        q AS (
            SELECT CAST(floor(((x * 3.6 - 180) + 180) / 360 * 256)
                        AS BIGINT) AS lngq,
                   CAST(floor(((y * 1.8 - 90) + 90) / 180 * 128)
                        AS BIGINT) AS latq
            FROM imgs
        ), d1 AS (
            SELECT ((lngq | (lngq << 4)) & 252645135) AS a,
                   ((latq | (latq << 4)) & 252645135) AS b
            FROM q
        ), d2 AS (
            SELECT ((a | (a << 2)) & 858993459) AS a,
                   ((b | (b << 2)) & 858993459) AS b
            FROM d1
        ), d3 AS (
            SELECT ((a | (a << 1)) & 1431655765) AS a,
                   ((b | (b << 1)) & 1431655765) AS b
            FROM d2
        ), c AS (
            SELECT (a | (b << 1)) AS code FROM d3
        ), g AS (
            SELECT substr('0123456789bcdefghjkmnpqrstuvwxyz',
                          CAST((code >> 10) & 31 AS INTEGER) + 1, 1)
                || substr('0123456789bcdefghjkmnpqrstuvwxyz',
                          CAST((code >> 5) & 31 AS INTEGER) + 1, 1)
                || substr('0123456789bcdefghjkmnpqrstuvwxyz',
                          CAST(code & 31 AS INTEGER) + 1, 1) AS gh
            FROM c
        )
        SELECT gh, count(*) AS n_images FROM g GROUP BY 1
    """
    sql["rank_sums"] = """
        WITH t AS (
            SELECT event_type,
                   CAST(floor(value * 100) AS BIGINT) AS c
            FROM events
        ), r AS (
            SELECT event_type,
                   2 * (count(*) OVER (ORDER BY c
                                       RANGE UNBOUNDED PRECEDING))
                     - (count(*) OVER (PARTITION BY c)) + 1 AS r2
            FROM t
        )
        SELECT event_type, count(*) AS n_g,
               CAST(sum(r2) AS BIGINT) AS r2_sum
        FROM r GROUP BY 1
    """
    sql["winsorized"] = """
        WITH v AS (
            SELECT event_type,
                   CAST(floor(value * 100) AS BIGINT) AS c
            FROM events
        ), b AS (
            SELECT CAST(quantile_disc(CAST(c AS DOUBLE), 0.01) AS BIGINT)
                       AS lo,
                   CAST(quantile_disc(CAST(c AS DOUBLE), 0.99) AS BIGINT)
                       AS hi
            FROM v
        )
        SELECT event_type, count(*) AS n,
               CAST(sum(least(greatest(c, lo), hi)) AS BIGINT)
                   AS sum_wcents
        FROM v, b GROUP BY 1
    """
    sql["mad_outliers"] = """
        WITH v AS (
            SELECT event_type,
                   CAST(floor(value * 100) AS BIGINT) AS c
            FROM events
        ), m AS (
            SELECT CAST(quantile_disc(CAST(c AS DOUBLE), 0.5) AS BIGINT)
                       AS med
            FROM v
        ), d AS (
            SELECT CAST(quantile_disc(CAST(abs(c - med) AS DOUBLE), 0.5)
                        AS BIGINT) AS mad
            FROM v, m
        )
        SELECT event_type, count(*) AS n,
               CAST(sum(CASE WHEN abs(c - med) > 3 * mad
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
               med AS med_cents, mad AS mad_cents
        FROM v, m, d GROUP BY 1, 4, 5
    """
    sql["gini_order_value"] = """
        WITH v AS (
            SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c
            FROM orders
        ), d AS (
            SELECT c, count(*) AS cnt FROM v GROUP BY 1
        ), w AS (
            SELECT c, cnt,
                   COALESCE(sum(cnt) OVER (
                       ORDER BY c
                       ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING), 0) AS cum0
            FROM d
        ), m AS (
            SELECT sum(CAST(c AS HUGEINT)
                       * (2 * CAST(cnt AS HUGEINT) * CAST(cum0 AS HUGEINT)
                          + CAST(cnt AS HUGEINT)
                            * (CAST(cnt AS HUGEINT) + 1))) AS t2,
                   sum(CAST(c AS HUGEINT) * CAST(cnt AS HUGEINT)) AS s,
                   sum(CAST(cnt AS HUGEINT)) AS n
            FROM w)
        SELECT CAST(n AS BIGINT) AS n,
               CAST(t2 - (n + 1) * s AS DOUBLE)
               / CAST(n * s AS DOUBLE) AS gini
        FROM m
    """
    sql["local_supplier_revenue"] = """
        SELECT n.n_name,
               CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                        * (100 - CAST(round(l.l_discount * 100)
                                      AS BIGINT))) AS BIGINT)
                   AS revenue_bp
        FROM customer c
        JOIN orders o ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE c.c_nationkey = s.s_nationkey
          AND o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate <  TIMESTAMP '1997-01-01'
        GROUP BY 1
    """
    sql["getis_ord"] = f"""
        WITH {_IMGS},
        cells AS (
            SELECT CAST(floor(x / 5.0) AS BIGINT) AS cx,
                   CAST(floor(y / 5.0) AS BIGINT) AS cy,
                   count(*) AS n
            FROM imgs GROUP BY 1, 2
        ), g AS (
            SELECT count(*) AS nc, sum(n) AS s1,
                   sum(CAST(n AS HUGEINT) * CAST(n AS HUGEINT)) AS s2
            FROM cells
        ), nbr AS (
            SELECT i.cx, i.cy, i.n,
                   count(*) AS w_i,
                   sum(j.n) AS u_i
            FROM cells i JOIN cells j
              ON abs(i.cx - j.cx) <= 1 AND abs(i.cy - j.cy) <= 1
            GROUP BY 1, 2, 3
        )
        SELECT cx, cy, n, CAST(w_i AS BIGINT) AS w_i,
               CASE WHEN g.nc * w_i - w_i * w_i > 0 THEN
                   CAST(g.nc * u_i - g.s1 * w_i AS DOUBLE)
                   / sqrt(CAST(g.nc * g.s2 - CAST(g.s1 AS HUGEINT)
                               * CAST(g.s1 AS HUGEINT) AS DOUBLE)
                          * CAST(g.nc * w_i - w_i * w_i AS DOUBLE)
                          / CAST(g.nc - 1 AS DOUBLE))
               ELSE 0.0 END AS gi_star
        FROM nbr, g
    """
    sql["pushdown_read"] = """
        SELECT event_type,
               count(*) AS n_big,
               CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
                   AS sum_cents
        FROM events WHERE value > 300
        GROUP BY 1
    """
    sql["label_balance"] = """
        WITH c AS (
            SELECT min(cnt) AS m FROM (
                SELECT count(*) AS cnt FROM documents GROUP BY lang)
        ), r AS (
            SELECT lang, n_chars,
                   row_number() OVER (
                       PARTITION BY lang
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
            FROM documents
        )
        SELECT lang, count(*) AS n_kept,
               CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM r, c WHERE rn <= m
        GROUP BY 1
    """
    sql["spearman_corr"] = """
        WITH t AS (
            SELECT CAST(l_quantity AS BIGINT) AS x,
                   CAST(round(l_extendedprice * 100) AS BIGINT) AS y
            FROM lineitem
        ), r AS (
            SELECT 2 * (count(*) OVER (ORDER BY x
                                       RANGE UNBOUNDED PRECEDING))
                     - (count(*) OVER (PARTITION BY x)) + 1 AS r2x,
                   2 * (count(*) OVER (ORDER BY y
                                       RANGE UNBOUNDED PRECEDING))
                     - (count(*) OVER (PARTITION BY y)) + 1 AS r2y
            FROM t
        ), m AS (
            SELECT CAST(count(*) AS HUGEINT) n,
                   sum(CAST(r2x AS HUGEINT)) sx,
                   sum(CAST(r2y AS HUGEINT)) sy,
                   sum(CAST(r2x AS HUGEINT) * CAST(r2x AS HUGEINT)) sxx,
                   sum(CAST(r2y AS HUGEINT) * CAST(r2y AS HUGEINT)) syy,
                   sum(CAST(r2x AS HUGEINT) * CAST(r2y AS HUGEINT)) sxy
            FROM r)
        SELECT CAST(n AS BIGINT) AS n,
               CAST(n*sxy - sx*sy AS DOUBLE)
               / (sqrt(CAST(n*sxx - sx*sx AS DOUBLE))
                  * sqrt(CAST(n*syy - sy*sy AS DOUBLE))) AS spearman
        FROM m
    """
    sql["dasymetric_alloc"] = f"""
        WITH {_IMGS}, {_LAYER},
        t AS (
            SELECT poly_id, {_TILE} AS tile_id, count(*) AS n_images
            FROM imgs JOIN layer ON {_COVERS}
            GROUP BY 1, 2
        ), p AS (
            SELECT poly_id, sum(n_images) AS n_poly FROM t GROUP BY 1
        )
        SELECT t.poly_id, t.tile_id, t.n_images,
               CAST((t.poly_id + 1) * 1000 * t.n_images AS DOUBLE)
               / CAST(p.n_poly AS DOUBLE) AS alloc
        FROM t JOIN p USING (poly_id)
    """
    sql["daily_autocorr"] = """
        WITH d AS (
            SELECT epoch_us(ts) // 86400000000 AS day, count(*) AS n
            FROM events GROUP BY 1
        ), b AS (SELECT min(day) AS lo, max(day) AS hi FROM d),
        spine AS (
            SELECT unnest(generate_series(lo, hi)) AS day FROM b
        ), dense AS (
            SELECT spine.day, COALESCE(d.n, 0) AS n
            FROM spine LEFT JOIN d USING (day)
        ), pairs AS (
            SELECT n AS x, LEAD(n) OVER (ORDER BY day) AS y FROM dense
        ), pr AS (SELECT x, y FROM pairs WHERE y IS NOT NULL),
        m AS (
            SELECT CAST(count(*) AS HUGEINT) n,
                   sum(CAST(x AS HUGEINT)) sx, sum(CAST(y AS HUGEINT)) sy,
                   sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) sxx,
                   sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) syy,
                   sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) sxy
            FROM pr)
        SELECT (SELECT CAST(hi - lo + 1 AS BIGINT) FROM b) AS n_days,
               CAST(n*sxy - sx*sy AS DOUBLE)
               / (sqrt(CAST(n*sxx - sx*sx AS DOUBLE))
                  * sqrt(CAST(n*syy - sy*sy AS DOUBLE))) AS autocorr
        FROM m
    """
    sql["cdc_state"] = """
        WITH e AS (
            SELECT user_id, epoch_us(ts) AS ts_us, event_id,
                   event_type = 'error' AS is_del,
                   CAST(floor(value * 100) AS BIGINT) AS cents
            FROM events
        ), r AS (
            SELECT *, row_number() OVER (
                PARTITION BY user_id
                ORDER BY ts_us DESC, event_id DESC) AS rn
            FROM e
        )
        SELECT user_id, cents AS last_cents
        FROM r WHERE rn = 1 AND NOT is_del
    """
    sql["json_roundtrip"] = """
        SELECT event_type,
               CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
                   AS sum_cents
        FROM events GROUP BY 1
    """
    sql["wds_shards"] = """
        WITH f AS (
            SELECT CASE WHEN event_id % 2 = 0 THEN 'raw'
                        WHEN event_id % 4 = 1 THEN 'qraw'
                        ELSE 'png' END AS fmt,
                   length(event_type || ' #'
                          || CAST(event_id AS VARCHAR)) AS cap_len
            FROM events
        )
        SELECT fmt, count(*) AS n_images,
               CAST(sum(cap_len) AS BIGINT) AS sum_caption_chars
        FROM f GROUP BY 1
    """
    sql["quality_buckets"] = """
        WITH b AS (
            SELECT quantile_disc(CAST(n_chars AS DOUBLE), 0.25) AS b25,
                   quantile_disc(CAST(n_chars AS DOUBLE), 0.50) AS b50,
                   quantile_disc(CAST(n_chars AS DOUBLE), 0.75) AS b75
            FROM documents
        )
        SELECT lang,
               CASE WHEN CAST(n_chars AS DOUBLE) <= b25 THEN 0
                    WHEN CAST(n_chars AS DOUBLE) <= b50 THEN 1
                    WHEN CAST(n_chars AS DOUBLE) <= b75 THEN 2
                    ELSE 3 END AS bucket,
               count(*) AS n_docs
        FROM documents, b
        GROUP BY 1, 2
    """
    sql["part_best_supplier"] = """
        WITH r AS (
            SELECT l_partkey, l_extendedprice, l_suppkey,
                   row_number() OVER (
                       PARTITION BY l_partkey
                       ORDER BY l_extendedprice, l_suppkey) AS rn
            FROM lineitem
        )
        SELECT r.l_partkey,
               r.l_extendedprice AS best_price,
               s.s_name
        FROM r JOIN supplier s ON s.s_suppkey = r.l_suppkey
        WHERE rn = 1
    """
    sql["bottom_decile"] = """
        WITH e AS (
            SELECT event_type,
                   CAST(floor(value * 100) AS BIGINT) AS cents
            FROM events
        ), w AS (
            SELECT event_type, cents,
                   count(*) OVER (PARTITION BY event_type
                                  ORDER BY cents
                                  RANGE UNBOUNDED PRECEDING) AS rank_le,
                   count(*) OVER (PARTITION BY event_type) AS n
            FROM e
        )
        SELECT event_type,
               count(*) AS n_decile,
               CAST(sum(cents) AS BIGINT) AS sum_cents
        FROM w WHERE 10 * rank_le <= n
        GROUP BY 1
    """
    sql["sssp_min_cost"] = """
        WITH raw AS (
            SELECT event_id % 499 AS x,
                   (event_id // 499 + event_id % 491) % 499 AS y,
                   (event_id % 97) + 1 AS w
            FROM events
        ), und AS (
            SELECT x AS a, y AS b, w FROM raw WHERE x <> y
            UNION ALL
            SELECT y AS a, x AS b, w FROM raw WHERE x <> y
        ), e AS (
            SELECT a, b, min(w) AS w FROM und GROUP BY 1, 2
        ), d0 AS (SELECT CAST(0 AS BIGINT) AS node, CAST(0 AS BIGINT) AS cost),
        d1 AS (
            SELECT node, min(cost) AS cost FROM (
                SELECT node, cost FROM d0
                UNION ALL
                SELECT e.b AS node, d0.cost + e.w AS cost
                FROM d0 JOIN e ON e.a = d0.node
            ) GROUP BY 1
        ), d2 AS (
            SELECT node, min(cost) AS cost FROM (
                SELECT node, cost FROM d1
                UNION ALL
                SELECT e.b AS node, d1.cost + e.w AS cost
                FROM d1 JOIN e ON e.a = d1.node
            ) GROUP BY 1
        ), d3 AS (
            SELECT node, min(cost) AS cost FROM (
                SELECT node, cost FROM d2
                UNION ALL
                SELECT e.b AS node, d2.cost + e.w AS cost
                FROM d2 JOIN e ON e.a = d2.node
            ) GROUP BY 1
        )
        SELECT node, cost FROM d3
    """
    sql["morans_i"] = f"""
        WITH {_IMGS},
        cells AS (
            SELECT CAST(floor(x / 5.0) AS BIGINT) AS cx,
                   CAST(floor(y / 5.0) AS BIGINT) AS cy,
                   count(*) AS n
            FROM imgs GROUP BY 1, 2
        ), g AS (
            SELECT count(*) AS n_cells, sum(n) AS s FROM cells
        ), a AS (
            SELECT cx, cy, CAST(g.n_cells * cells.n - g.s AS HUGEINT) AS a
            FROM cells, g
        ), pairs AS (
            SELECT i.a AS ai, j.a AS aj
            FROM a i JOIN a j
              ON (abs(i.cx - j.cx) + abs(i.cy - j.cy)) = 1
        ), agg AS (
            SELECT (SELECT count(*) FROM pairs) AS w,
                   (SELECT sum(ai * aj) FROM pairs) AS num,
                   (SELECT sum(a * a) FROM a) AS den,
                   (SELECT n_cells FROM g) AS n_cells
        )
        SELECT CAST(n_cells AS BIGINT) AS n_cells,
               CAST(w AS BIGINT) AS w_pairs,
               (CAST(n_cells AS DOUBLE) * CAST(num AS DOUBLE)) /
               (CAST(w AS DOUBLE) * CAST(den AS DOUBLE)) AS morans_i
        FROM agg
    """
    sql["aspect_buckets"] = """
        WITH img AS (
            SELECT event_id,
                   32 + (event_id % 4) * 16 AS w,
                   32 + (event_id % 3) * 16 AS h
            FROM events
        ), ratio AS (
            SELECT * FROM (VALUES
                (0, 1, 2), (1, 2, 3), (2, 3, 4), (3, 1, 1),
                (4, 4, 3), (5, 3, 2), (6, 2, 1)
            ) AS t(bucket, p, q)
        ), scored AS (
            SELECT img.w, img.h, ratio.bucket, ratio.p, ratio.q,
                   abs(img.w * ratio.q - img.h * ratio.p) * (12 // ratio.q)
                       AS score,
                   row_number() OVER (
                       PARTITION BY img.event_id
                       ORDER BY abs(img.w * ratio.q - img.h * ratio.p)
                                * (12 // ratio.q), ratio.bucket) AS rn
            FROM img CROSS JOIN ratio
        )
        SELECT bucket, p AS ratio_p, q AS ratio_q,
               count(*) AS n_images,
               CAST(sum(w * h) AS BIGINT) AS sum_pixels
        FROM scored WHERE rn = 1
        GROUP BY 1, 2, 3
    """
    sql["region_dissolve"] = """
        WITH b AS (
            SELECT DISTINCT event_id % 6 AS region,
                            event_id % 24 AS x0,
                            (event_id // 24) % 20 AS y0
            FROM events
        ), wb AS (
            SELECT region, x0, y0,
                   1 + (x0 + y0) % 3 AS w,
                   1 + (x0 * 3 + y0) % 5 AS h
            FROM b
        ), cells AS (
            -- union area of integer-aligned boxes == covered unit cells
            SELECT DISTINCT region, x0 + gx.g AS cx, y0 + gy.g AS cy
            FROM wb
            JOIN (SELECT unnest(generate_series(0, 2)) AS g) gx
              ON gx.g < w
            JOIN (SELECT unnest(generate_series(0, 4)) AS g) gy
              ON gy.g < h
        ), nb AS (SELECT region, count(*) AS n_boxes FROM wb GROUP BY 1),
           ar AS (SELECT region, count(*) AS union_area FROM cells
                  GROUP BY 1)
        SELECT nb.region, CAST(nb.n_boxes AS BIGINT) AS n_boxes,
               CAST(ar.union_area AS BIGINT) AS union_area
        FROM nb JOIN ar USING (region)
    """
    sql["ohlc_daily"] = """
        WITH e AS (
            SELECT epoch_us(ts) // 86400000000 AS day, epoch_us(ts) AS ts_us,
                   event_id, CAST(floor(value * 100) AS BIGINT) AS cents
            FROM events
        )
        SELECT day,
               first(cents ORDER BY ts_us, event_id) AS open_cents,
               max(cents) AS high_cents,
               min(cents) AS low_cents,
               last(cents ORDER BY ts_us, event_id) AS close_cents
        FROM e GROUP BY day
    """
    sql["xcorr_lag"] = """
        WITH d AS (
            SELECT epoch_us(ts) // 86400000000 AS day,
                   count(*) FILTER (event_type = 'click') AS x,
                   count(*) FILTER (event_type = 'purchase') AS y
            FROM events WHERE event_type IN ('click', 'purchase')
            GROUP BY 1
        ), bnd AS (SELECT min(day) lo, max(day) hi FROM d),
        spine AS (SELECT unnest(generate_series(lo, hi)) AS day FROM bnd),
        dense AS (
            SELECT spine.day, COALESCE(d.x, 0) AS x, COALESCE(d.y, 0) AS y
            FROM spine LEFT JOIN d USING (day)
        ), lags AS (SELECT unnest(generate_series(0, 7)) AS lag),
        pairs AS (
            SELECT l.lag, a.x * b.y AS xy
            FROM lags l
            JOIN dense a ON TRUE
            JOIN dense b ON b.day = a.day + l.lag
        )
        SELECT l.lag, CAST(COALESCE(sum(p.xy), 0) AS BIGINT) AS dot
        FROM lags l LEFT JOIN pairs p ON p.lag = l.lag
        GROUP BY 1
    """
    sql["simpson_diversity"] = """
        WITH c AS (
            SELECT user_id, event_type, count(*) AS c
            FROM events GROUP BY 1, 2
        ), a AS (
            SELECT user_id, CAST(sum(c) AS BIGINT) AS n,
                   CAST(sum(c * c) AS BIGINT) AS s
            FROM c GROUP BY 1
        )
        SELECT user_id, n AS n_events,
               CAST(n * n - s AS DOUBLE) / CAST(n * n AS DOUBLE) AS simpson
        FROM a
    """
    _dense = """
        WITH d AS (
            SELECT epoch_us(ts) // 86400000000 AS day, {agg} AS v
            FROM events GROUP BY 1
        ), bnd AS (SELECT min(day) lo, max(day) hi FROM d),
        spine AS (SELECT unnest(generate_series(lo, hi)) AS day FROM bnd),
        dense AS (
            SELECT spine.day, COALESCE(d.v, 0) AS v
            FROM spine LEFT JOIN d USING (day)
        )"""
    sql["mann_kendall"] = _dense.format(agg="count(*)") + """
        , pr AS (
            SELECT CASE WHEN b.v > a.v THEN 1
                        WHEN b.v < a.v THEN -1 ELSE 0 END AS sgn
            FROM dense a JOIN dense b ON b.day > a.day
        ), ties AS (
            SELECT CAST(sum(c * (c - 1)) AS BIGINT) AS t2
            FROM (SELECT v, count(*) AS c FROM dense GROUP BY 1)
        )
        SELECT (SELECT CAST(hi - lo + 1 AS BIGINT) FROM bnd) AS n_days,
               (SELECT CAST(COALESCE(sum(sgn), 0) AS BIGINT) FROM pr)
                   AS s_stat,
               (SELECT t2 FROM ties) AS tie_pairs2
    """
    sql["cusum_changepoint"] = _dense.format(
        agg="CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)") + """
        , pre AS (
            SELECT day,
                   sum(v) OVER (ORDER BY day) AS st,
                   row_number() OVER (ORDER BY day) AS t,
                   count(*) OVER () AS n,
                   sum(v) OVER () AS sn
            FROM dense
        )
        SELECT day AS split_day,
               CAST(abs(n * st - t * sn) AS BIGINT) AS dev
        FROM pre WHERE t < n
        ORDER BY abs(n * st - t * sn) DESC, day ASC LIMIT 1
    """
    _kcore_edges = """
        WITH m AS (
            SELECT event_id % 397 AS x,
                   (event_id // 397 + event_id % 389) % 397 AS y
            FROM events WHERE event_id <= 1000
        ), e0 AS MATERIALIZED (
            SELECT DISTINCT least(x, y) AS a, greatest(x, y) AS b
            FROM m WHERE x <> y
        )"""
    _peel = ""
    for _r in range(_KCORE_ROUNDS):
        # MATERIALIZED: each round references the previous one three
        # times — inlined CTEs would expand to 3^rounds base scans
        _peel += f"""
        , n{_r + 1} AS MATERIALIZED (
            SELECT node FROM (
                SELECT a AS node FROM e{_r}
                UNION ALL SELECT b FROM e{_r}
            ) GROUP BY 1 HAVING count(*) >= {_KCORE_K}
        ), e{_r + 1} AS MATERIALIZED (
            SELECT e{_r}.a, e{_r}.b FROM e{_r}
            JOIN n{_r + 1} na ON na.node = e{_r}.a
            JOIN n{_r + 1} nb ON nb.node = e{_r}.b
        )"""
    sql["k_core"] = _kcore_edges + _peel + f"""
        SELECT node, CAST(count(*) AS BIGINT) AS deg
        FROM (SELECT a AS node FROM e{_KCORE_ROUNDS}
              UNION ALL SELECT b FROM e{_KCORE_ROUNDS})
        GROUP BY 1
    """
    sql["ewma_value"] = """
        WITH e AS (
            SELECT event_id, user_id, epoch_us(ts) AS ts_us,
                   CAST(floor(value * 100) AS BIGINT) AS cents,
                   row_number() OVER (
                       PARTITION BY user_id
                       ORDER BY epoch_us(ts), event_id) AS rn
            FROM events
        ), j AS (
            SELECT a.event_id, a.user_id,
                   CAST(sum(b.cents * (1 << (9 - (a.rn - b.rn))))
                        AS BIGINT) AS num,
                   CAST(sum(1 << (9 - (a.rn - b.rn))) AS BIGINT) AS den
            FROM e a JOIN e b
              ON b.user_id = a.user_id AND a.rn - b.rn BETWEEN 0 AND 9
            GROUP BY 1, 2
        )
        SELECT user_id, event_id, num AS ewma_num, den AS ewma_den,
               CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS ewma
        FROM j
    """
    sql["rfm_segments"] = """
        WITH e AS (
            SELECT user_id, epoch_us(ts) AS ts_us,
                   CAST(floor(value * 100) AS BIGINT) AS cents
            FROM events
        ), per AS (
            SELECT user_id, max(ts_us) AS last_ts,
                   CAST(count(*) AS BIGINT) AS freq,
                   CAST(sum(cents) AS BIGINT) AS mon
            FROM e GROUP BY 1
        ), g AS (SELECT max(last_ts) // 86400000000 AS gday FROM per),
        met AS (
            SELECT user_id, mon,
                   (SELECT gday FROM g) - last_ts // 86400000000 AS r_days,
                   freq
            FROM per
        ), b AS (
            SELECT mon,
                   ntile(5) OVER (ORDER BY r_days, user_id) AS r_q,
                   ntile(5) OVER (ORDER BY freq, user_id) AS f_q,
                   ntile(5) OVER (ORDER BY mon, user_id) AS m_q
            FROM met
        )
        SELECT r_q, f_q, m_q, CAST(count(*) AS BIGINT) AS n_users,
               CAST(sum(mon) AS BIGINT) AS sum_cents
        FROM b GROUP BY 1, 2, 3
    """
    sql["acf_table"] = _dense.format(agg="count(*)") + """
        , lags AS (SELECT unnest(generate_series(1, 14)) AS lag),
        pr AS (
            SELECT l.lag, a.v AS x, b.v AS y
            FROM lags l
            JOIN dense a ON TRUE
            JOIN dense b ON b.day = a.day + l.lag
        ), m AS (
            SELECT lag, CAST(count(*) AS HUGEINT) n,
                   sum(CAST(x AS HUGEINT)) sx, sum(CAST(y AS HUGEINT)) sy,
                   sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) sxx,
                   sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) syy,
                   sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) sxy
            FROM pr GROUP BY 1)
        SELECT lag, CAST(n*sxy - sx*sy AS DOUBLE)
               / (sqrt(CAST(n*sxx - sx*sx AS DOUBLE))
                  * sqrt(CAST(n*syy - sy*sy AS DOUBLE))) AS acf
        FROM m
    """
    sql["theil_sen"] = _dense.format(agg="count(*)") + """
        , pr AS (
            SELECT CAST(b.v - a.v AS DOUBLE) / (b.day - a.day) AS slope
            FROM dense a JOIN dense b ON b.day > a.day
        )
        SELECT CAST(count(*) AS BIGINT) AS n_pairs,
               median(slope) AS slope
        FROM pr
    """
    sql["value_shape_stats"] = """
        WITH e AS (
            SELECT event_type,
                   CAST(floor(value * 100) AS HUGEINT) AS c
            FROM events
        ), m AS (
            SELECT event_type, CAST(count(*) AS HUGEINT) n,
                   sum(c) s, sum(c*c) s2, sum(c*c*c) s3, sum(c*c*c*c) s4
            FROM e GROUP BY 1
        ), cm AS (
            SELECT event_type, n,
                   n*s2 - s*s AS m2,
                   n*n*s3 - 3*n*s*s2 + 2*s*s*s AS m3,
                   n*n*n*s4 - 4*n*n*s*s3 + 6*n*s*s*s2 - 3*s*s*s*s AS m4
            FROM m)
        SELECT event_type, CAST(n AS BIGINT) AS n,
               CAST(m3 AS DOUBLE)
                   / (CAST(m2 AS DOUBLE) * sqrt(CAST(m2 AS DOUBLE)))
                   AS skew,
               CAST(m4 AS DOUBLE) / (CAST(m2 AS DOUBLE) * CAST(m2 AS DOUBLE))
                   - 3.0 AS kurtosis
        FROM cm
    """
    sql["benford_digits"] = """
        WITH e AS (
            SELECT CAST(floor(value * 100) AS BIGINT) AS c FROM events
        )
        SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS BIGINT) AS digit,
               CAST(count(*) AS BIGINT) AS n
        FROM e WHERE c > 0 GROUP BY 1
    """
    sql["q10_returned"] = """
        WITH r AS (
            SELECT o_custkey AS c_custkey,
                   CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                            * (100 - CAST(round(l_discount * 100)
                                          AS BIGINT))) AS BIGINT)
                       AS revenue_bp
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE l_returnflag = 'R'
              AND o_orderdate >= TIMESTAMP '1996-07-01'
              AND o_orderdate <  TIMESTAMP '1996-10-01'
            GROUP BY 1
        )
        SELECT r.c_custkey, revenue_bp, c_name
        FROM r JOIN customer ON r.c_custkey = customer.c_custkey
        ORDER BY revenue_bp DESC, r.c_custkey LIMIT 20
    """
    sql["q15_top_supplier"] = """
        WITH r AS (
            SELECT l_suppkey AS s_suppkey,
                   CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                            * (100 - CAST(round(l_discount * 100)
                                          AS BIGINT))) AS BIGINT)
                       AS total_bp
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1996-04-01'
            GROUP BY 1
        )
        SELECT r.s_suppkey, total_bp, s_name
        FROM r JOIN supplier ON r.s_suppkey = supplier.s_suppkey
        WHERE total_bp = (SELECT max(total_bp) FROM r)
    """
    sql["q17_small_qty"] = """
        WITH b AS (
            SELECT l_partkey, CAST(round(l_quantity) AS BIGINT) AS qty,
                   CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_brand = 'Brand#11'
        ), s AS (
            SELECT l_partkey, sum(qty) AS sq, count(*) AS n
            FROM b GROUP BY 1
        )
        SELECT CAST(count(*) AS BIGINT) AS n_items,
               CAST(sum(cents) AS BIGINT) AS sum_cents
        FROM b JOIN s USING (l_partkey)
        WHERE 5 * qty * n < sq
    """
    sql["q19_disjunct"] = """
        WITH j AS (
            SELECT CAST(round(l_quantity) AS BIGINT) AS qty,
                   CAST(round(l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(round(l_discount * 100) AS BIGINT))
                       AS rev_bp,
                   p_brand, p_size
            FROM lineitem JOIN part ON l_partkey = p_partkey
        )
        SELECT CAST(count(*) AS BIGINT) AS n_items,
               CAST(coalesce(sum(rev_bp), 0) AS BIGINT) AS revenue_bp
        FROM j
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 25
               AND qty BETWEEN 1 AND 21)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 30
               AND qty BETWEEN 10 AND 30)
           OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 40
               AND qty BETWEEN 20 AND 40)
    """
    sql["prefix_dup_docs"] = """
        SELECT doc_id FROM documents d
        WHERE EXISTS (
            SELECT 1 FROM documents o
            WHERE o.doc_id <> d.doc_id
              AND starts_with(o.text, d.text)
              AND (length(o.text) > length(d.text)
                   OR o.doc_id < d.doc_id))
    """
    sql["minmax_scaled"] = """
        WITH m AS (SELECT min(value) AS mn, max(value) AS mx FROM events)
        SELECT event_id, (value - mn) / (mx - mn) AS scaled
        FROM events, m
    """
    sql["dim_stats"] = """
        WITH x AS (
            SELECT i.i AS dim,
                   CAST(round(CAST(embedding[i.i + 1] AS DOUBLE)
                              * 1000000) AS BIGINT) AS mv
            FROM embeddings,
                 LATERAL (SELECT unnest(range(len(embedding))) AS i) i(i)
        ), m AS (
            SELECT dim, CAST(count(*) AS HUGEINT) AS n,
                   sum(CAST(mv AS HUGEINT)) AS s,
                   sum(CAST(mv AS HUGEINT) * CAST(mv AS HUGEINT)) AS ss
            FROM x GROUP BY 1
        )
        SELECT dim, CAST(n AS BIGINT) AS n,
               CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean_micro,
               CAST(n * ss - s * s AS DOUBLE) / CAST(n * n AS DOUBLE)
                   AS var_micro2
        FROM m
    """
    sql["degree_assortativity"] = """
        WITH pairs AS (
            SELECT DISTINCT l_partkey, l_orderkey FROM lineitem
        ), dp AS (
            SELECT l_partkey, CAST(count(*) AS BIGINT) AS dx
            FROM pairs GROUP BY 1
        ), dor AS (
            SELECT l_orderkey, CAST(count(*) AS BIGINT) AS dy
            FROM pairs GROUP BY 1
        ), e AS (
            SELECT dx, dy FROM pairs
            JOIN dp USING (l_partkey) JOIN dor USING (l_orderkey)
        ), m AS (
            SELECT CAST(count(*) AS HUGEINT) n,
                   sum(CAST(dx AS HUGEINT)) sx,
                   sum(CAST(dy AS HUGEINT)) sy,
                   sum(CAST(dx AS HUGEINT) * CAST(dx AS HUGEINT)) sxx,
                   sum(CAST(dy AS HUGEINT) * CAST(dy AS HUGEINT)) syy,
                   sum(CAST(dx AS HUGEINT) * CAST(dy AS HUGEINT)) sxy
            FROM e
        )
        SELECT CAST(n AS BIGINT) AS n,
               CAST(n*sxy - sx*sy AS DOUBLE)
               / (sqrt(CAST(n*sxx - sx*sx AS DOUBLE))
                  * sqrt(CAST(n*syy - sy*sy AS DOUBLE))) AS corr
        FROM m
    """
    sql["user_record_high"] = """
        WITH w AS (
            SELECT user_id, value,
                   max(value) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ) AS prevmax
            FROM events
        )
        SELECT user_id,
               CAST(count(*) FILTER (WHERE prevmax IS NULL
                                        OR value > prevmax) AS BIGINT)
                   AS n_records,
               CAST(count(*) AS BIGINT) AS n_events
        FROM w GROUP BY 1
    """
    sql["sequence_ngrams"] = """
        WITH s AS (
            SELECT event_type AS e1,
                   lead(event_type, 1) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS e2,
                   lead(event_type, 2) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS e3
            FROM events
        )
        SELECT e1, e2, e3, CAST(count(*) AS BIGINT) AS n
        FROM s WHERE e3 IS NOT NULL
        GROUP BY 1, 2, 3
        ORDER BY n DESC, e1, e2, e3 LIMIT 20
    """
    sql["setsim_orders"] = """
        WITH b AS (
            SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        ), sz AS (
            SELECT l_orderkey, CAST(count(*) AS BIGINT) c
            FROM b GROUP BY 1
        ), i AS (
            SELECT a.l_orderkey o1, bb.l_orderkey o2,
                   CAST(count(*) AS BIGINT) inter
            FROM b a JOIN b bb
              ON a.l_partkey = bb.l_partkey
             AND a.l_orderkey < bb.l_orderkey
            GROUP BY 1, 2
        )
        SELECT o1, o2, inter, s1.c AS c1, s2.c AS c2
        FROM i JOIN sz s1 ON o1 = s1.l_orderkey
               JOIN sz s2 ON o2 = s2.l_orderkey
        WHERE 2 * inter >= (s1.c + s2.c - inter)
    """
    sql["boilerplate_ngrams"] = """
        WITH w AS (
            SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        ), g AS (
            SELECT doc_id, array_to_string(ws[i.i:i.i+4], ' ') AS gram
            FROM w, LATERAL (
                SELECT unnest(range(1, len(ws) - 3)) AS i) i(i)
        ), c AS (
            SELECT gram, CAST(count(DISTINCT doc_id) AS BIGINT) AS nd,
                   CAST(count(*) AS BIGINT) AS nc
            FROM g GROUP BY 1
        )
        SELECT gram, nd, nc FROM c
        ORDER BY nd DESC, nc DESC, gram LIMIT 20
    """
    sql["mkt_share"] = """
        WITH an AS (
            SELECT n_nationkey FROM nation JOIN region
              ON n_regionkey = r_regionkey WHERE r_name = 'ASIA'
        ), o AS (
            SELECT o_orderkey,
                   CAST(year(o_orderdate) AS BIGINT) AS o_year
            FROM orders JOIN customer ON o_custkey = c_custkey
            WHERE c_nationkey IN (SELECT n_nationkey FROM an)
              AND o_orderdate >= TIMESTAMP '1995-01-01'
              AND o_orderdate <  TIMESTAMP '1997-01-01'
        ), j AS (
            SELECT o_year,
                   CAST(round(l_extendedprice * 100) AS BIGINT)
                   * (100 - CAST(round(l_discount * 100) AS BIGINT))
                       AS rev_bp,
                   CASE WHEN s_nationkey = 2 THEN 1 ELSE 0 END AS tgt
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN o ON l_orderkey = o_orderkey
        )
        SELECT o_year,
               CAST(sum(rev_bp * tgt) AS BIGINT) AS target_bp,
               CAST(sum(rev_bp) AS BIGINT) AS total_bp,
               CAST(sum(rev_bp * tgt) AS DOUBLE)
                   / CAST(sum(rev_bp) AS DOUBLE) AS mkt_share
        FROM j GROUP BY 1
    """
    sql["quantile_normalize"] = """
        WITH e AS (
            SELECT event_id, CAST(floor(value * 100) AS BIGINT) AS c
            FROM events
        ), r AS (
            SELECT c, count(*) AS cnt FROM e GROUP BY 1
        ), s AS (
            SELECT c, sum(cnt) OVER (
                ORDER BY c ROWS UNBOUNDED PRECEDING) AS le
            FROM r
        )
        SELECT event_id,
               CAST(le AS DOUBLE)
                   / CAST((SELECT count(*) FROM e) AS DOUBLE) AS cdist
        FROM e JOIN s USING (c)
    """
    sql["longest_streak"] = """
        WITH o AS (
            SELECT user_id, event_type,
                   row_number() OVER (
                       PARTITION BY user_id
                       ORDER BY ts, event_id) AS rn,
                   row_number() OVER (
                       PARTITION BY user_id, event_type
                       ORDER BY ts, event_id) AS rt
            FROM events
        ), runs AS (
            SELECT user_id, event_type, rn - rt AS grp,
                   count(*) AS cnt
            FROM o GROUP BY 1, 2, 3
        )
        SELECT user_id, CAST(max(cnt) AS BIGINT) AS longest
        FROM runs GROUP BY 1
    """
    sql["table_checksums"] = """
        SELECT user_id % 16 AS bucket,
               bit_xor(CAST(concat('0x',
                   substr(md5(CAST(event_id AS VARCHAR)), 1, 15))
                   AS BIGINT)) AS checksum,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1
    """
    sql["debounce_events"] = """
        WITH w AS (
            SELECT event_id, ts,
                   lag(ts) OVER (
                       PARTITION BY user_id, event_type
                       ORDER BY ts, event_id) AS prev
            FROM events
        )
        SELECT event_id FROM w
        WHERE prev IS NULL
           OR epoch_us(ts) - epoch_us(prev) > 300000000
    """
    sql["order_skyline"] = """
        WITH o AS (
            SELECT o_orderkey,
                   CAST(round(o_totalprice * 100) AS BIGINT)
                       AS price_cents,
                   CAST(epoch_us(o_orderdate) AS BIGINT) AS date_us
            FROM orders
        )
        SELECT o_orderkey, price_cents, date_us FROM o a
        WHERE NOT EXISTS (
            SELECT 1 FROM o b
            WHERE b.price_cents >= a.price_cents
              AND b.date_us >= a.date_us
              AND (b.price_cents > a.price_cents
                   OR b.date_us > a.date_us))
    """
    sql["brand_wavg_price"] = """
        WITH j AS (
            SELECT p_brand,
                   CAST(round(l_extendedprice * 100) AS BIGINT)
                       * CAST(round(l_quantity) AS BIGINT) AS wsum,
                   CAST(round(l_quantity) AS BIGINT) AS qty
            FROM lineitem JOIN part ON l_partkey = p_partkey
        )
        SELECT p_brand,
               CAST(sum(wsum) AS BIGINT) AS sum_weighted_cents,
               CAST(sum(qty) AS BIGINT) AS sum_qty,
               CAST(sum(wsum) AS DOUBLE) / CAST(sum(qty) AS DOUBLE)
                   AS wavg_cents
        FROM j GROUP BY 1
    """
    sql["cell_adjacency"] = f"""
        WITH {_IMGS},
        c AS (
            SELECT DISTINCT CAST(floor(x / 5.0) AS BIGINT) * 1048576
                   + CAST(floor(y / 5.0) AS BIGINT) AS cell
            FROM imgs
        )
        SELECT a.cell AS cell_a, b.cell AS cell_b
        FROM c a JOIN c b
          ON b.cell = a.cell + 1048576 OR b.cell = a.cell + 1
    """
    sql["hive_partition_roundtrip"] = """
        SELECT user_id, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS sum_cents
        FROM events WHERE event_type = 'purchase'
        GROUP BY 1
    """
    sql["q12_linestatus"] = """
        SELECT l_linestatus,
               CAST(sum(CASE WHEN o_orderpriority IN
                    ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
                    AS BIGINT) AS high_count,
               CAST(sum(CASE WHEN o_orderpriority IN
                    ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END)
                    AS BIGINT) AS low_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1
    """
    sql["above_avg_orders"] = """
        WITH o AS (
            SELECT o_custkey,
                   CAST(round(o_totalprice * 100) AS BIGINT) AS cents
            FROM orders
        ), s AS (
            SELECT o_custkey, sum(cents) AS sm, count(*) AS n
            FROM o GROUP BY 1
        )
        SELECT o.o_custkey,
               CAST(sum(CASE WHEN o.cents * s.n > s.sm
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_above_avg,
               CAST(count(*) AS BIGINT) AS n_orders
        FROM o JOIN s ON o.o_custkey = s.o_custkey
        GROUP BY 1
    """
    sql["dup_rate_by_source"] = """
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(count(DISTINCT substr(md5(text), 1, 16))
                    AS BIGINT) AS n_distinct,
               CAST(count(*) - count(DISTINCT substr(md5(text), 1, 16))
                    AS BIGINT) AS n_dups
        FROM documents GROUP BY 1
    """
    sql["rolling_median"] = """
        SELECT event_id,
               median(value) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS med
        FROM events
    """
    sql["power_users_division"] = """
        WITH p AS (SELECT DISTINCT user_id, event_type FROM events)
        SELECT user_id FROM p GROUP BY 1
        HAVING count(*) = (SELECT count(DISTINCT event_type)
                           FROM events)
    """
    sql["next_purchase"] = """
        WITH c AS (
            SELECT event_id, user_id,
                   CAST(epoch_us(ts) AS BIGINT) AS t
            FROM events WHERE event_type = 'click'
        ), p AS (
            SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS t
            FROM events WHERE event_type = 'purchase'
        )
        SELECT c.event_id,
               CAST(coalesce(min(p.t), -1) AS BIGINT)
                   AS next_purchase_us
        FROM c LEFT JOIN p
          ON p.user_id = c.user_id AND p.t > c.t
        GROUP BY 1
    """
    sql["value_drift"] = """
        WITH b AS (
            SELECT CAST(min(epoch_us(ts)) AS BIGINT) tmn,
                   CAST(max(epoch_us(ts)) AS BIGINT) tmx,
                   min(value) vmn, max(value) vmx
            FROM events
        ), e AS (
            SELECT least(CAST(floor(((value - b.vmn)
                       / (b.vmx - b.vmn)) * 20) AS BIGINT), 19)
                       AS bucket,
                   CASE WHEN CAST(epoch_us(ts) AS BIGINT)
                             > (b.tmn + b.tmx) // 2
                        THEN 1 ELSE 0 END AS is_b
            FROM events, b
        ), h AS (
            SELECT bucket,
                   CAST(sum(1 - is_b) AS HUGEINT) ca,
                   CAST(sum(is_b) AS HUGEINT) cb
            FROM e GROUP BY 1
        ), spine AS (
            SELECT CAST(unnest(range(20)) AS BIGINT) AS bucket
        ), t AS (
            SELECT spine.bucket,
                   CAST(coalesce(h.ca, 0) AS HUGEINT) ca,
                   CAST(coalesce(h.cb, 0) AS HUGEINT) cb,
                   (SELECT sum(ca) FROM h) na,
                   (SELECT sum(cb) FROM h) nb
            FROM spine LEFT JOIN h USING (bucket)
        )
        SELECT bucket, CAST(ca AS BIGINT) AS count_a,
               CAST(cb AS BIGINT) AS count_b,
               CASE WHEN ca + cb = 0 THEN 0.0
                    ELSE CAST((ca*nb - cb*na) * (ca*nb - cb*na)
                              AS DOUBLE)
                         / CAST(na * nb * (ca + cb) AS DOUBLE)
               END AS chi2_term
        FROM t
    """
    sql["paa_symbols"] = """
        WITH o AS (
            SELECT user_id,
                   CAST(round(value * 100) AS BIGINT) AS cents,
                   row_number() OVER (
                       PARTITION BY user_id
                       ORDER BY ts, event_id) - 1 AS pos,
                   count(*) OVER (PARTITION BY user_id) AS n
            FROM events
        )
        SELECT user_id, CAST(pos * 8 // n AS BIGINT) AS seg,
               CAST((CASE WHEN sum(cents) > 2500 * count(*)
                          THEN 1 ELSE 0 END)
                  + (CASE WHEN sum(cents) > 5000 * count(*)
                          THEN 1 ELSE 0 END)
                  + (CASE WHEN sum(cents) > 7500 * count(*)
                          THEN 1 ELSE 0 END) AS BIGINT) AS symbol
        FROM o GROUP BY user_id, pos * 8 // n
    """
    sql["seasonal_naive_error"] = """
        WITH d AS (
            SELECT CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS day,
                   count(*) AS n
            FROM events GROUP BY 1
        ), cal AS (
            SELECT CAST(unnest(range(
                (SELECT min(day) FROM d),
                (SELECT max(day) FROM d) + 1)) AS BIGINT) AS day
        ), dense AS (
            SELECT cal.day, CAST(coalesce(d.n, 0) AS BIGINT) AS n
            FROM cal LEFT JOIN d USING (day)
        ), scored AS (
            SELECT n, lag(n, 7) OVER (ORDER BY day) AS pred
            FROM dense
        )
        SELECT CAST(count(*) AS BIGINT) AS n_days,
               CAST(sum(abs(n - pred)) AS BIGINT) AS abs_err,
               CAST(sum(n - pred) AS BIGINT) AS bias,
               CAST(sum(abs(n - pred)) AS DOUBLE)
                   / CAST(count(*) AS DOUBLE) AS mae
        FROM scored WHERE pred IS NOT NULL
    """
    sql["source_vocab_overlap"] = """
        WITH sw AS (
            SELECT DISTINCT source, unnest(string_split(text, ' '))
                   AS word
            FROM documents
        ), sz AS (
            SELECT source, CAST(count(*) AS BIGINT) AS nv
            FROM sw GROUP BY 1
        ), i AS (
            SELECT a.source AS source_a, b.source AS source_b,
                   CAST(count(*) AS BIGINT) AS inter
            FROM sw a JOIN sw b
              ON a.word = b.word AND a.source < b.source
            GROUP BY 1, 2
        )
        SELECT source_a, source_b, inter,
               s1.nv AS va, s2.nv AS vb,
               CAST(inter AS DOUBLE)
                   / CAST(s1.nv + s2.nv - inter AS DOUBLE) AS jaccard
        FROM i JOIN sz s1 ON source_a = s1.source
               JOIN sz s2 ON source_b = s2.source
    """
    sql["fk_violations"] = """
        SELECT 'lineitem->orders' AS relationship,
               CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orphans
        FROM lineitem WHERE l_orderkey NOT IN
            (SELECT o_orderkey FROM orders)
        UNION ALL
        SELECT 'orders->customer',
               CAST(count(DISTINCT o_custkey) AS BIGINT)
        FROM orders WHERE o_custkey NOT IN
            (SELECT c_custkey FROM customer)
    """
    sql["priority_percent_rank"] = """
        SELECT o_orderkey,
               percent_rank() OVER (
                   PARTITION BY o_orderpriority
                   ORDER BY CAST(round(o_totalprice * 100) AS BIGINT)
               ) AS pr
        FROM orders
    """
    sql["target_encode_type"] = """
        WITH e AS (
            SELECT event_id, event_type,
                   CAST(round(value * 100) AS BIGINT) AS cents
            FROM events
        ), s AS (
            SELECT event_type, sum(cents) AS sm, count(*) AS n
            FROM e GROUP BY 1
        )
        SELECT event_id,
               CASE WHEN s.n > 1
                    THEN CAST(s.sm - e.cents AS DOUBLE)
                         / CAST(s.n - 1 AS DOUBLE)
                    ELSE -1.0 END AS loo_cents
        FROM e JOIN s USING (event_type)
    """
    sql["zscore_normalize"] = """
        WITH e AS (
            SELECT event_id,
                   CAST(round(value * 100) AS BIGINT) AS c
            FROM events
        ), m AS (
            SELECT CAST(count(*) AS HUGEINT) n,
                   sum(CAST(c AS HUGEINT)) s,
                   sum(CAST(c AS HUGEINT) * CAST(c AS HUGEINT)) ss
            FROM e
        )
        SELECT event_id,
               CAST(n * c - s AS DOUBLE)
                   / sqrt(CAST(n * ss - s * s AS DOUBLE)) AS z
        FROM e, m
    """
    sql["ngram_novelty"] = """
        WITH w AS (
            SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        ), g AS (
            SELECT DISTINCT doc_id,
                   array_to_string(ws[i.i:i.i+4], ' ') AS gram
            FROM w, LATERAL (
                SELECT unnest(range(1, len(ws) - 3)) AS i) i(i)
        ), df AS (
            SELECT gram, count(*) AS df FROM g GROUP BY 1
        )
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
               CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_unique,
               CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END)
                    AS DOUBLE) / CAST(count(*) AS DOUBLE) AS novelty
        FROM g JOIN df USING (gram)
        GROUP BY 1
    """
    sql["regr2_price"] = """
        WITH m AS (
            SELECT CAST(count(*) AS HUGEINT) n,
                   sum(CAST(round(l_quantity) AS HUGEINT)) s1,
                   sum(CAST(round(l_discount*100) AS HUGEINT)) s2,
                   sum(CAST(round(l_quantity) AS HUGEINT)
                       * CAST(round(l_quantity) AS HUGEINT)) s11,
                   sum(CAST(round(l_discount*100) AS HUGEINT)
                       * CAST(round(l_discount*100) AS HUGEINT)) s22,
                   sum(CAST(round(l_quantity) AS HUGEINT)
                       * CAST(round(l_discount*100) AS HUGEINT)) s12,
                   sum(CAST(round(l_extendedprice*100) AS HUGEINT)) sy,
                   sum(CAST(round(l_extendedprice*100) AS HUGEINT)
                       * CAST(round(l_quantity) AS HUGEINT)) sy1,
                   sum(CAST(round(l_extendedprice*100) AS HUGEINT)
                       * CAST(round(l_discount*100) AS HUGEINT)) sy2
            FROM lineitem
        )
        SELECT CAST(n AS BIGINT) AS n,
               CAST(sy*(s11*s22 - s12*s12) - s1*(sy1*s22 - s12*sy2)
                    + s2*(sy1*s12 - s11*sy2) AS DOUBLE)
               / CAST(n*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2)
                      + s2*(s1*s12 - s11*s2) AS DOUBLE) AS b0,
               CAST(n*(sy1*s22 - s12*sy2) - sy*(s1*s22 - s12*s2)
                    + s2*(s1*sy2 - sy1*s2) AS DOUBLE)
               / CAST(n*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2)
                      + s2*(s1*s12 - s11*s2) AS DOUBLE) AS b_qty,
               CAST(n*(s11*sy2 - sy1*s12) - s1*(s1*sy2 - sy1*s2)
                    + sy*(s1*s12 - s11*s2) AS DOUBLE)
               / CAST(n*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2)
                      + s2*(s1*s12 - s11*s2) AS DOUBLE) AS b_disc
        FROM m
    """
    sql["bounce_rate"] = """
        WITH o AS (
            SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS t,
                   lag(CAST(epoch_us(ts) AS BIGINT)) OVER (
                       PARTITION BY user_id
                       ORDER BY CAST(epoch_us(ts) AS BIGINT)) AS prev
            FROM events
        ), s AS (
            SELECT user_id,
                   sum(CASE WHEN prev IS NULL
                             OR t - prev > 1800000000
                            THEN 1 ELSE 0 END) OVER (
                       PARTITION BY user_id ORDER BY t
                       ROWS UNBOUNDED PRECEDING) AS sid
            FROM o
        ), c AS (
            SELECT user_id, sid, count(*) AS ne
            FROM s GROUP BY 1, 2
        )
        SELECT user_id, CAST(count(*) AS BIGINT) AS n_sessions,
               CAST(sum(CASE WHEN ne = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_bounce,
               CAST(sum(CASE WHEN ne = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                   / CAST(count(*) AS DOUBLE) AS bounce_rate
        FROM c GROUP BY 1
    """
    sql["survival_hazard"] = """
        WITH fc AS (
            SELECT user_id, min(CAST(epoch_us(ts) AS BIGINT)) AS fc
            FROM events WHERE event_type = 'click' GROUP BY 1
        ), fp AS (
            SELECT e.user_id,
                   min(CAST(epoch_us(e.ts) AS BIGINT)) AS fp
            FROM events e JOIN fc ON e.user_id = fc.user_id
            WHERE e.event_type = 'purchase'
              AND CAST(epoch_us(e.ts) AS BIGINT) >= fc.fc
            GROUP BY 1
        ), mx AS (
            SELECT max(CAST(epoch_us(ts) AS BIGINT)) AS m FROM events
        ), u AS (
            SELECT fc.user_id,
                   CASE WHEN fp.fp IS NULL
                        THEN (mx.m - fc.fc) // 86400000000
                        ELSE (fp.fp - fc.fc) // 86400000000
                   END AS t,
                   CASE WHEN fp.fp IS NULL THEN 0 ELSE 1 END AS ev
            FROM fc LEFT JOIN fp USING (user_id), mx
        ), d AS (
            SELECT t, CAST(sum(ev) AS BIGINT) AS n_event,
                   CAST(count(*) AS BIGINT) AS total
            FROM u GROUP BY 1
        )
        SELECT t AS day,
               CAST((SELECT sum(total) FROM d d2 WHERE d2.t >= d.t)
                    AS BIGINT) AS n_risk,
               n_event,
               CAST(n_event AS DOUBLE)
                   / CAST((SELECT sum(total) FROM d d2
                           WHERE d2.t >= d.t) AS DOUBLE) AS hazard
        FROM d
    """
    sql["decile_gains"] = """
        WITH s AS (
            SELECT user_id,
                   sum(CAST(floor(value * 100) AS BIGINT)) AS spend
            FROM events GROUP BY 1
        ), d AS (
            SELECT spend,
                   ntile(10) OVER (ORDER BY spend DESC, user_id)
                       AS decile
            FROM s
        ), g AS (
            SELECT decile, CAST(count(*) AS BIGINT) AS n_users,
                   CAST(sum(spend) AS BIGINT) AS cents
            FROM d GROUP BY 1
        )
        SELECT decile, n_users, cents,
               CAST(sum(cents) OVER (ORDER BY decile
                    ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                   / CAST((SELECT sum(cents) FROM g) AS DOUBLE)
                   AS cum_share
        FROM g
    """
    sql["ab_test_ztest"] = """
        WITH e AS (
            SELECT user_id % 2 AS arm,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                       AS conv
            FROM events WHERE event_type IN ('click', 'purchase')
        ), c AS (
            SELECT CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END)
                        AS BIGINT) n1,
                   CAST(sum(CASE WHEN arm = 0 THEN conv ELSE 0 END)
                        AS BIGINT) x1,
                   CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END)
                        AS BIGINT) n2,
                   CAST(sum(CASE WHEN arm = 1 THEN conv ELSE 0 END)
                        AS BIGINT) x2
            FROM e
        )
        SELECT n1 AS n_a, x1 AS conv_a, n2 AS n_b, x2 AS conv_b,
               ((CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE))
                - (CAST(x2 AS DOUBLE) / CAST(n2 AS DOUBLE)))
               / sqrt(((CAST(x1 + x2 AS DOUBLE)
                        / CAST(n1 + n2 AS DOUBLE))
                       * (1.0 - CAST(x1 + x2 AS DOUBLE)
                                / CAST(n1 + n2 AS DOUBLE)))
                      * (1.0 / CAST(n1 AS DOUBLE)
                         + 1.0 / CAST(n2 AS DOUBLE))) AS z
        FROM c
    """
    sql["nearest_purchase"] = """
        WITH c AS (
            SELECT event_id, user_id,
                   CAST(epoch_us(ts) AS BIGINT) AS t
            FROM events WHERE event_type = 'click'
        ), p AS (
            SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS t
            FROM events WHERE event_type = 'purchase'
        ), j AS (
            SELECT c.event_id, p.t,
                   row_number() OVER (
                       PARTITION BY c.event_id
                       ORDER BY abs(p.t - c.t), p.t) AS rn
            FROM c JOIN p ON p.user_id = c.user_id
        )
        SELECT c.event_id,
               CAST(coalesce(j.t, -1) AS BIGINT) AS nearest_us
        FROM c LEFT JOIN j
          ON j.event_id = c.event_id AND j.rn = 1
    """
    return sql
