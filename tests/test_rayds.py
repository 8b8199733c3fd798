"""Ray Data pipeline layer tests: join/tiles/shuffle/ckpt vs brute force.

Brute-force numpy references are computed driver-side over the same
derived table, so these tests are independent of the DuckDB oracle
(which the driver runs separately via __ray_entry__.oracle_sql)."""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ray_ready(ray_session):
    return True


def _brute_pairs(sf_dir, predicate="covers"):
    from engine.rayds.imagetab import derive_xy, load_layer

    eid = pq.read_table(f"{sf_dir}/events.parquet", columns=["event_id"])[
        "event_id"
    ].to_numpy()
    x, y = derive_xy(eid)
    layer = load_layer(sf_dir)
    out = set()
    for i in range(len(layer.poly_ids)):
        b = layer.bounds[i]
        if predicate == "covers":
            m = (x >= b[0]) & (x <= b[2]) & (y >= b[1]) & (y <= b[3])
        else:
            m = (x > b[0]) & (x < b[2]) & (y > b[1]) & (y < b[3])
        for e in eid[m]:
            out.add((f"img{e}", int(layer.poly_ids[i])))
    return out


def test_pairs_join_matches_brute_force(ray_ready):
    from engine.rayds import pipeline

    got = {
        (r["image_id"], int(r["poly_id"]))
        for r in pipeline.pairs_dataset(SF).select_columns(["image_id", "poly_id"]).take_all()
    }
    assert got == _brute_pairs(SF, "covers")


def test_contains_join_matches_brute_force(ray_ready):
    from engine.rayds import pipeline

    got = {
        (r["image_id"], int(r["poly_id"]))
        for r in pipeline.pairs_dataset(SF, "contains").select_columns(["image_id", "poly_id"]).take_all()
    }
    assert got == _brute_pairs(SF, "contains")


def test_actor_pool_join_matches_task_join(ray_ready):
    from engine.rayds import pipeline

    a = sorted(
        (r["image_id"], int(r["poly_id"]))
        for r in pipeline.pairs_dataset(SF, use_actors=True).select_columns(["image_id", "poly_id"]).take_all()
    )
    b = sorted(
        (r["image_id"], int(r["poly_id"]))
        for r in pipeline.pairs_dataset(SF, use_actors=False).select_columns(["image_id", "poly_id"]).take_all()
    )
    assert a == b


def test_tiles_within_polygon_bounds(ray_ready):
    from engine.rayds import pipeline

    rows = pipeline.tiles_dataset(SF).take_all()
    assert len(rows) > 0
    for r in rows[:200]:
        assert 0 <= r["tile_id"] < 16


def test_grouped_count_matches_pandas(ray_ready):
    import ray.data

    from engine.rayds.shuffle import grouped_count, salted_grouped_count

    tbl = pa.table({"k": pa.array([1, 1, 2, 3, 3, 3] * 100)})
    ds = ray.data.from_arrow(tbl)
    for fn in (grouped_count, salted_grouped_count):
        got = {int(r["k"]): int(r["cnt"]) for r in fn(ds, ["k"]).take_all()}
        assert got == {1: 200, 2: 100, 3: 300}, fn.__name__


def test_grouped_count_shuffle_path(ray_ready):
    import ray.data

    from engine.rayds.shuffle import grouped_count

    ds = ray.data.from_arrow(pa.table({"k": pa.array([5, 5, 7])}))
    got = {int(r["k"]): int(r["cnt"]) for r in grouped_count(ds, ["k"], use_shuffle=True).take_all()}
    assert got == {5: 2, 7: 1}


def test_choose_count_plan_by_cardinality(ray_ready):
    """The sampled plan chooser must pick hash-shuffle for keys whose
    cardinality grows with the input and tree-reduce for small key sets."""
    import ray.data

    from engine.rayds.shuffle import choose_count_plan, grouped_count

    n = 20000
    high = ray.data.from_arrow(
        pa.table({"k": pa.array(np.arange(n) % (n // 2))})
    )
    low = ray.data.from_arrow(pa.table({"k": pa.array(np.arange(n) % 7)}))
    assert choose_count_plan(high, ["k"]) is True
    assert choose_count_plan(low, ["k"]) is False
    # the auto plan must produce identical counts either way
    a = sorted(
        (r["k"], r["cnt"])
        for r in grouped_count(low, ["k"], use_shuffle="auto").take_all()
    )
    b = sorted(
        (r["k"], r["cnt"])
        for r in grouped_count(low, ["k"], use_shuffle=True).take_all()
    )
    assert a == b


def test_fused_tile_counts_match_staged(ray_ready):
    """The manually fused hot path must produce the same tile counts as
    the staged pipeline (tile_counts with salted shuffle)."""
    import ray

    from engine.rayds import pipeline, shuffle
    from engine.rayds.imagetab import image_dataset, load_layer
    from engine.rayds.stages import make_fused_tiles_partial_fn

    staged = {
        (int(r["poly_id"]), int(r["tile_id"])): int(r["n_images"])
        for r in pipeline.tile_counts(SF, salted=True).take_all()
    }
    ref = ray.put(load_layer(SF))
    fused = image_dataset(SF).map_batches(
        make_fused_tiles_partial_fn(ref), batch_format="pyarrow", batch_size=None
    )
    got = {
        (int(r["poly_id"]), int(r["tile_id"])): int(r["n_images"])
        for r in shuffle.merge_partial_counts(
            fused, ["poly_id", "tile_id"], out_col="n_images"
        ).take_all()
    }
    assert got == staged


def test_knn_centers_matches_brute(ray_ready):
    from engine.rayds import pipeline
    from engine.rayds.imagetab import derive_xy, load_layer

    got = {r["image_id"]: int(r["poly_id"]) for r in pipeline.knn_centers_dataset(SF).take_all()}
    eid = pq.read_table(f"{SF}/events.parquet", columns=["event_id"])["event_id"].to_numpy()
    x, y = derive_xy(eid)
    layer = load_layer(SF)
    order = np.argsort(layer.poly_ids)
    cx = ((layer.bounds[:, 0] + layer.bounds[:, 2]) / 2)[order]
    cy = ((layer.bounds[:, 1] + layer.bounds[:, 3]) / 2)[order]
    ids = layer.poly_ids[order]
    d2 = (x[:, None] - cx) ** 2 + (y[:, None] - cy) ** 2
    want = ids[np.argmin(d2, axis=1)]
    for e, w in zip(eid, want):
        assert got[f"img{e}"] == int(w)


def test_dwithin_matches_brute(ray_ready):
    from engine.rayds import pipeline
    from engine.rayds.imagetab import derive_xy, load_layer

    d = 1.5
    got = {
        (r["image_id"], int(r["poly_id"]))
        for r in pipeline.dwithin_dataset(SF, d).take_all()
    }
    eid = pq.read_table(f"{SF}/events.parquet", columns=["event_id"])["event_id"].to_numpy()
    x, y = derive_xy(eid)
    layer = load_layer(SF)
    want = set()
    for i in range(len(layer.poly_ids)):
        b = layer.bounds[i]
        dx = np.maximum(np.maximum(b[0] - x, x - b[2]), 0.0)
        dy = np.maximum(np.maximum(b[1] - y, y - b[3]), 0.0)
        m = dx * dx + dy * dy <= d * d
        for e in eid[m]:
            want.add((f"img{e}", int(layer.poly_ids[i])))
    assert got == want


def test_checkpoint_resume(ray_ready, tmp_path):
    from engine.rayds import ckpt, pipeline

    out = str(tmp_path / "tiles_out")
    r1 = pipeline.run_tiles_checkpointed(SF, out, num_shards=1)
    assert r1["computed"] == [0] and r1["skipped"] == []
    # second run: everything skipped (manifest fingerprints match)
    r2 = pipeline.run_tiles_checkpointed(SF, out, num_shards=1)
    assert r2["computed"] == [] and r2["skipped"] == [0]
    # corrupt the manifest -> recomputed
    os.remove(ckpt.manifest_path(out, 0))
    r3 = pipeline.run_tiles_checkpointed(SF, out, num_shards=1)
    assert r3["computed"] == [0]
    # manifest records lineage + rows
    import json

    with open(ckpt.manifest_path(out, 0)) as f:
        m = json.load(f)
    assert m["status"] == "complete" and m["rows"] > 0 and m["inputs"]


def test_cell_encode_columns(ray_ready):
    from engine.rayds import pipeline

    row = pipeline.encoded_dataset(SF).take(1)[0]
    for col in ("cell", "s2_id", "hex7", "hex8", "hex9"):
        assert col in row


def test_payload_validate_psnr(ray_ready):
    from engine.rayds.imgstage import validate_dataset

    rows = validate_dataset(SF).limit(64).take_all()
    assert len(rows) == 64
    assert all(r["psnr_ok"] for r in rows)


def test_tile_mosaics(ray_ready, tmp_path):
    from engine.img import codec
    from engine.rayds import mosaic, pipeline

    rows = mosaic.tile_mosaics(SF).take_all()
    # one mosaic per (poly, tile) group present in the tile counts
    counts = pipeline.tile_counts(SF).take_all()
    assert len(rows) == len(counts)
    want = {(int(r["poly_id"]), int(r["tile_id"])): int(r["n_images"]) for r in counts}
    for r in rows[:20]:
        assert want[(int(r["poly_id"]), int(r["tile_id"]))] == int(r["n_images"])
        img = codec.png_decode(r["mosaic_png"])
        assert img.shape == (r["mosaic_h"], r["mosaic_w"], 3)
    # deterministic across runs
    again = mosaic.tile_mosaics(SF).take_all()
    a = {(r["poly_id"], r["tile_id"]): r["mosaic_png"] for r in rows}
    b = {(r["poly_id"], r["tile_id"]): r["mosaic_png"] for r in again}
    assert a == b
    # partitioned write
    n = mosaic.write_tile_mosaics(SF, str(tmp_path / "mosaics"))
    assert n > 0


def test_cellpart_join_matches_broadcast(ray_ready):
    """Big-big (cell co-partitioned shuffle) and broadcast plans must
    produce identical pair sets."""
    from engine.rayds import pipeline
    from engine.rayds.celljoin import cellpart_pairs

    a = {
        (r["image_id"], int(r["poly_id"]))
        for r in cellpart_pairs(SF).take_all()
    }
    b = {
        (r["image_id"], int(r["poly_id"]))
        for r in pipeline.pairs_dataset(SF).select_columns(["image_id", "poly_id"]).take_all()
    }
    assert a == b


def test_cellpart_join_exact_on_dense_polygons(ray_ready):
    """The in-group refinement must be the EXACT point-in-polygon kernel,
    not a bbox test: on a layer of 32-gon footprints (bbox ⊃ polygon) the
    cell-partitioned plan must still match the broadcast plan."""
    from engine.rayds import pipeline
    from engine.rayds.celljoin import cellpart_pairs
    from engine.rayds.imagetab import make_dense_layer

    layer = make_dense_layer(n_polys=200, verts=16, radius=4.0)
    a = {
        (r["image_id"], int(r["poly_id"]))
        for r in cellpart_pairs(SF, layer=layer).take_all()
    }
    b = {
        (r["image_id"], int(r["poly_id"]))
        for r in pipeline.pairs_dataset(SF, layer=layer)
        .select_columns(["image_id", "poly_id"]).take_all()
    }
    assert len(b) > 0 and a == b


def test_asof_join_matches_brute(ray_ready):
    """AS-OF join vs a driver-side brute force: for every click, the
    latest same-user view at-or-before it (unmatched clicks drop)."""
    import ray.data

    from engine.ops.asof import asof_join

    t = pq.read_table(f"{SF}/events.parquet",
                      columns=["event_id", "user_id", "ts", "event_type"])
    eid = t["event_id"].to_numpy()
    uid = t["user_id"].to_numpy()
    ts = t["ts"].cast("int64").to_numpy()
    et = np.asarray(t["event_type"].to_pylist())
    want = {}
    for i in np.nonzero(et == "click")[0]:
        best = None
        for j in np.nonzero((et == "view") & (uid == uid[i]))[0]:
            if ts[j] <= ts[i] and (best is None or ts[j] > ts[best]
                                   or (ts[j] == ts[best] and eid[j] > eid[best])):
                best = j
        if best is not None:
            want[int(eid[i])] = int(eid[best])
    ds = ray.data.from_arrow(t)
    got = {
        int(r["event_id"]): int(r["match_id"])
        for r in asof_join(ds, "click", "view").take_all()
    }
    assert got == want and len(want) > 0


def test_boxpart_range_join_matches_brute(ray_ready):
    """bbox×bbox range join (both sides cell-exploded + pair dedupe)
    against a driver-side brute force."""
    from engine.rayds.celljoin import boxpart_pairs
    from engine.rayds.imagetab import derive_xy, load_layer

    eid = pq.read_table(f"{SF}/events.parquet", columns=["event_id"])[
        "event_id"
    ].to_numpy()
    x, y = derive_xy(eid)
    w = 32 + (eid % 4) * 16
    h = w / 512.0
    layer = load_layer(SF)
    want = set()
    for i in range(len(layer.poly_ids)):
        b = layer.bounds[i]
        m = (x - h <= b[2]) & (x + h >= b[0]) & (y - h <= b[3]) & (y + h >= b[1])
        for e in eid[m]:
            want.add((f"img{e}", int(layer.poly_ids[i])))
    got = {
        (r["image_id"], int(r["poly_id"]))
        for r in boxpart_pairs(SF).take_all()
    }
    assert got == want


def test_s2_and_hex_keyed_joins_match_broadcast(ray_ready):
    """The S2- and hex-keyed physical plans must reproduce the broadcast
    join exactly (the cell ids are real shuffle keys, not decoration)."""
    from engine.rayds import pipeline
    from engine.rayds.celljoin import hexpart_pairs, s2part_pairs

    want = {
        (r["image_id"], int(r["poly_id"]))
        for r in pipeline.pairs_dataset(SF).select_columns(["image_id", "poly_id"]).take_all()
    }
    got_s2 = {
        (r["image_id"], int(r["poly_id"])) for r in s2part_pairs(SF).take_all()
    }
    got_hex = {
        (r["image_id"], int(r["poly_id"])) for r in hexpart_pairs(SF).take_all()
    }
    assert got_s2 == want and got_hex == want


def test_cellpart_join_hot_cell_salting(ray_ready):
    """Restricting salt replication to a known-hot cell set must not
    change the join output (salting is a physical-plan knob only)."""
    from engine.geo import cells as C
    from engine.rayds.celljoin import PART_CELL, cellpart_pairs

    hot = [int(C.grid_cell(np.array([50.0]), np.array([50.0]), PART_CELL)[0])]
    a = {
        (r["image_id"], int(r["poly_id"]))
        for r in cellpart_pairs(
            SF, hot_cells=hot, salt=4, part_cell=PART_CELL
        ).take_all()
    }
    b = {
        (r["image_id"], int(r["poly_id"]))
        for r in cellpart_pairs(SF, salt=1).take_all()
    }
    assert a == b


def test_checkpoint_resume_ranges(ray_ready, tmp_path):
    from engine.rayds import ckpt, pipeline

    out = str(tmp_path / "ranges_out")
    r1 = pipeline.run_tiles_checkpointed_ranges(SF, out, num_shards=3)
    assert r1["computed"] == [0, 1, 2]
    r2 = pipeline.run_tiles_checkpointed_ranges(SF, out, num_shards=3)
    assert r2 == {"computed": [], "skipped": [0, 1, 2]}
    os.remove(ckpt.manifest_path(out, 1))
    r3 = pipeline.run_tiles_checkpointed_ranges(SF, out, num_shards=3)
    assert r3 == {"computed": [1], "skipped": [0, 2]}
    # union of shard outputs == unsharded tile rows
    import pyarrow.parquet as pq
    total = 0
    for i in range(3):
        d = os.path.join(out, f"shard={i}")
        total += sum(pq.ParquetFile(os.path.join(d, f)).metadata.num_rows
                     for f in os.listdir(d) if f.endswith(".parquet"))
    assert total == pipeline.tiles_dataset(SF).count()


def test_checkpoint_resume_celljoin(ray_ready, tmp_path):
    """Big-big cell join under manifests: resume recomputes only the
    failed shard, and the shard outputs partition the unsharded join."""
    from engine.rayds import ckpt, pipeline
    from engine.rayds.celljoin import cellpart_pairs

    out = str(tmp_path / "cj_out")
    r1 = pipeline.run_celljoin_checkpointed(SF, out, num_shards=3)
    assert r1["computed"] == [0, 1, 2]
    r2 = pipeline.run_celljoin_checkpointed(SF, out, num_shards=3)
    assert r2 == {"computed": [], "skipped": [0, 1, 2]}
    os.remove(ckpt.manifest_path(out, 2))
    r3 = pipeline.run_celljoin_checkpointed(SF, out, num_shards=3)
    assert r3 == {"computed": [2], "skipped": [0, 1]}
    import pyarrow.parquet as pq
    got = set()
    for i in range(3):
        d = os.path.join(out, f"shard={i}")
        for f in os.listdir(d):
            if f.endswith(".parquet"):
                t = pq.read_table(os.path.join(d, f), columns=["image_id", "poly_id"])
                got |= set(zip(t["image_id"].to_pylist(), t["poly_id"].to_pylist()))
    want = {
        (r["image_id"], r["poly_id"]) for r in cellpart_pairs(SF).take_all()
    }
    assert got == want


def test_checkpoint_resume_dedup(ray_ready, tmp_path):
    """Exact dedup under key-hash-shard manifests: per-shard results are
    globally complete per key; union == the unsharded dedup."""
    import __ray_entry__ as e
    from engine.rayds import ckpt, pipeline

    out = str(tmp_path / "dd_out")
    r1 = pipeline.run_dedup_checkpointed(SF, out, num_shards=3)
    assert r1["computed"] == [0, 1, 2]
    os.remove(ckpt.manifest_path(out, 0))
    r3 = pipeline.run_dedup_checkpointed(SF, out, num_shards=3)
    assert r3 == {"computed": [0], "skipped": [1, 2]}
    import pyarrow.parquet as pq
    got = set()
    for i in range(3):
        d = os.path.join(out, f"shard={i}")
        for f in os.listdir(d):
            if f.endswith(".parquet"):
                t = pq.read_table(os.path.join(d, f))
                got |= set(zip(t["key16"].to_pylist(), t["doc_id"].to_pylist(),
                               t["n_copies"].to_pylist()))
    want = {
        (r["key16"], r["doc_id"], r["n_copies"])
        for r in e.queries()["dedup_exact"](SF).take_all()
    }
    assert got == want


def test_flagship_on_real_input_hint_table(ray_ready, tmp_path):
    """The engine must run directly on a REAL input_hint table (not just
    the events-derived one): synth parquet -> source reader -> join ->
    tiles, results matching the brute force over the same coordinates."""
    from engine.img.synth import generate_table
    from engine.rayds import pipeline
    from engine.rayds.imagetab import load_layer
    from engine.rayds.source import image_table_dataset

    path = generate_table(1500, 11, cache_dir=str(tmp_path))
    ds = image_table_dataset(path)  # bytes column projected away
    assert "bytes" not in ds.schema().names
    layer = load_layer(SF)
    tiles = pipeline.tiles_dataset(SF, layer=layer, ds=ds)
    rows = tiles.take_all()
    # brute force over the synth table's coordinates
    import pyarrow.parquet as pq

    t = pq.read_table(path, columns=["image_id", "x", "y"])
    x = t["x"].to_numpy()
    y = t["y"].to_numpy()
    ids = t["image_id"].to_pylist()
    want = set()
    for i in range(len(layer.poly_ids)):
        b = layer.bounds[i]
        m = (x >= b[0]) & (x <= b[2]) & (y >= b[1]) & (y <= b[3])
        for k in np.flatnonzero(m):
            want.add((ids[k], int(layer.poly_ids[i])))
    got = {(r["image_id"], int(r["poly_id"])) for r in rows}
    assert got == want


def test_transcode_invariant_pixels_and_caption(ray_ready):
    """input_hint per-row invariant, end-to-end: transcode (decode →
    re-encode lossy qraw) must keep decoded pixels PSNR≥40dB vs the
    original AND carry the caption column through byte-identical."""
    from engine.img import codec
    from engine.rayds.imgstage import payload_dataset, transcode_dataset

    import pyarrow.compute as _pc

    def first48(b):
        n = _pc.utf8_slice_codeunits(b["image_id"], 3, 99)
        keep = _pc.less(_pc.cast(n, "int64"), 48)
        return b.filter(keep)

    orig = {r["image_id"]: r
            for r in payload_dataset(SF).map_batches(
                first48, batch_format="pyarrow").take_all()}
    rows = transcode_dataset(SF, to_fmt="qraw").map_batches(
        first48, batch_format="pyarrow").take_all()
    assert len(rows) == 48 == len(orig)
    for r in rows:
        o = orig[r["image_id"]]
        assert r["fmt"] == "qraw"
        assert r["caption"] == o["caption"]          # caption equality
        a = codec.decode_payload(o["bytes"], o["w"], o["h"], o["fmt"])
        b = codec.decode_payload(r["bytes"], r["w"], r["h"], "qraw")
        assert codec.psnr(b, a) >= 40.0              # decoded-pixel invariant


def test_region_vectorize_holes_and_parts():
    """Raster→vector group kernel: an 8-ring with unlit centre must
    vectorize to a polygon WITH A HOLE (boundary = 12 outer + 4 inner
    edges); two diagonal tiles make a 2-part region (8 edges)."""
    import numpy as np
    import pyarrow as pa

    from engine.rayds.mosaic import _region_vectorize

    def lookup(pid):
        return (0.0, 0.0, 4.0)  # side 4 -> unit tiles

    fn = _region_vectorize(lookup)
    # ring: tiles (tx,ty) around centre (1,1) in the 3x3 corner of 4x4
    ring = [(0, 0), (1, 0), (2, 0), (0, 1), (2, 1), (0, 2), (1, 2), (2, 2)]
    tid = np.array([ty * 4 + tx for tx, ty in ring], dtype=np.int64)
    # counts: lit tiles get 10, add one unlit (centre) with count 1
    g = pa.table({
        "poly_id": pa.array([7] * 9, type=pa.int64()),
        "tile_id": pa.array(np.concatenate([tid, [1 * 4 + 1]])),
        "n_images": pa.array(np.array([10] * 8 + [1], dtype=np.int64)),
    })
    out = fn(g)
    assert out["n_lit"][0].as_py() == 8
    assert out["boundary_edges"][0].as_py() == 16  # 12 outer + 4 hole
    # two isolated diagonal tiles -> multipart, 8 edges
    g2 = pa.table({
        "poly_id": pa.array([9, 9], type=pa.int64()),
        "tile_id": pa.array(np.array([0, 5], dtype=np.int64)),
        "n_images": pa.array(np.array([10, 10], dtype=np.int64)),
    })
    out2 = fn(g2)
    assert out2["n_lit"][0].as_py() == 2
    assert out2["boundary_edges"][0].as_py() == 8


def test_sessionize_matches_brute(ray_ready):
    """Session-window aggregate vs a driver-side brute force: strict
    >gap boundaries, ties at identical timestamps, keys spread over
    many partitions, and per-session count/sum integrity."""
    import ray.data

    from engine.rayds.shuffle import sessionize

    rng = np.random.default_rng(7)
    n = 5000
    users = rng.integers(0, 200, size=n)
    ts = np.sort(rng.integers(0, 10_000, size=n)).astype(np.int64)
    # force ties and exact-gap edges
    ts[1::50] = ts[0::50][: len(ts[1::50])]
    cents = rng.integers(-50, 100, size=n).astype(np.int64)
    t = pa.table({"user_id": pa.array(users), "ts_us": pa.array(ts),
                  "cents": pa.array(cents)})
    GAP = 100
    got = {
        (int(r["user_id"]), int(r["session_start_us"])):
            (int(r["n_events"]), int(r["sum_cents"]))
        for r in sessionize(ray.data.from_arrow(t), "user_id", "ts_us",
                            gap_us=GAP, sum_col="cents").take_all()
    }
    # brute force
    want = {}
    for u in np.unique(users):
        uts = np.sort(ts[users == u], kind="stable")
        uc = cents[users == u][np.argsort(ts[users == u], kind="stable")]
        start, cnt, tot = int(uts[0]), 0, 0
        prev = None
        for tt, cc in zip(uts, uc):
            if prev is not None and tt - prev > GAP:
                want[(int(u), start)] = (cnt, tot)
                start, cnt, tot = int(tt), 0, 0
            cnt += 1
            tot += int(cc)
            prev = tt
        want[(int(u), start)] = (cnt, tot)
    assert got == want


def test_hll_error_bound_and_merge(ray_ready):
    """HyperLogLog: estimate within ~5σ of exact on 100k distinct values;
    register merge is associative/commutative and equals the one-shot
    sketch; the Dataset plan matches the in-process sketch."""
    import ray.data

    from engine.ops import sketch

    vals = np.arange(100_000, dtype=np.int64) * 7919 + 13
    reg = sketch.hll_sketch(vals)
    est = sketch.hll_count(reg)
    assert abs(est - 100_000) / 100_000 < 0.05
    # merge of halves == whole
    r1 = sketch.hll_sketch(vals[:50_000])
    r2 = sketch.hll_sketch(vals[50_000:])
    merged = sketch.hll_merge(r1, r2)
    assert np.array_equal(merged, reg)
    # distributed plan: per-block partials + driver tree merge
    t = pa.table({"v": pa.array(np.repeat(vals, 2))})  # dups collapse
    est_ds = sketch.hll_distinct(ray.data.from_arrow(t), "v")
    assert abs(est_ds - 100_000) / 100_000 < 0.05


def test_distinct_count_exact_matches_brute(ray_ready):
    import ray.data

    from engine.ops import sketch

    rng = np.random.default_rng(3)
    g = rng.integers(0, 7, size=20_000)
    v = rng.integers(0, 500, size=20_000)
    t = pa.table({"g": pa.array(g), "v": pa.array(v)})
    got = {
        int(r["g"]): int(r["n_distinct"])
        for r in sketch.distinct_count_exact(
            ray.data.from_arrow(t), "g", "v"
        ).take_all()
    }
    want = {int(k): len(np.unique(v[g == k])) for k in np.unique(g)}
    assert got == want


def test_grouped_quantiles_matches_brute(ray_ready):
    """Exact counting-based quantiles vs numpy brute force under SQL
    quantile_disc rank semantics (rank = ceil(q*n), 1-indexed)."""
    import ray.data

    from engine.ops.sketch import grouped_quantiles

    rng = np.random.default_rng(11)
    g = rng.integers(0, 5, size=30_000)
    v = rng.integers(-100, 100, size=30_000).astype(np.int64)
    t = pa.table({"g": pa.array(g), "v": pa.array(v)})
    got = {
        (int(r["g"]), float(r["q"])): int(r["v"])
        for r in grouped_quantiles(
            ray.data.from_arrow(t), "g", "v"
        ).take_all()
    }
    want = {}
    for k in np.unique(g):
        vs = np.sort(v[g == k])
        n = len(vs)
        for q in (0.25, 0.5, 0.75, 0.95):
            rank = max(1, int(np.ceil(q * n - 1e-9)))
            want[(int(k), q)] = int(vs[rank - 1])
    assert got == want


def test_hash_equi_join_matches_brute(ray_ready):
    """Generic tagged-union hash join vs a driver brute force, incl.
    duplicate keys on both sides (cartesian within key) and unmatched
    keys dropping (inner semantics)."""
    import ray.data

    from engine.rayds.shuffle import hash_equi_join

    rng = np.random.default_rng(5)
    lk = rng.integers(0, 50, size=2000)
    rk = rng.integers(25, 75, size=1500)
    lt = pa.table({"k": pa.array(lk), "a": pa.array(np.arange(2000))})
    rt = pa.table({"j": pa.array(rk), "b": pa.array(np.arange(1500) * 10)})
    got = sorted(
        (int(r["_k"]), int(r["a"]), int(r["b"]))
        for r in hash_equi_join(
            ray.data.from_arrow(lt), ray.data.from_arrow(rt),
            "k", "j", ["a"], ["b"]
        ).take_all()
    )
    want = sorted(
        (int(k), int(a), int(b * 10))
        for i, (k, a) in enumerate(zip(lk, np.arange(2000)))
        for b, kk in zip(np.arange(1500), rk) if kk == k
    )
    assert got == want and len(got) > 0


def test_broadcast_equi_join_matches_hash(ray_ready):
    """Map-side broadcast join ≡ tagged-union hash join on the same data
    (the adaptive equi_join picks between them by small-side size)."""
    import ray.data

    from engine.rayds.shuffle import broadcast_equi_join, hash_equi_join

    rng = np.random.default_rng(6)
    lk = rng.integers(0, 40, size=300)
    rk = rng.integers(20, 60, size=4000)
    lt = ray.data.from_arrow(
        pa.table({"k": pa.array(lk), "a": pa.array(np.arange(300))})
    )
    rt = ray.data.from_arrow(
        pa.table({"j": pa.array(rk), "b": pa.array(np.arange(4000))})
    )
    b = sorted(
        (int(r["_k"]), int(r["a"]), int(r["b"]))
        for r in broadcast_equi_join(lt, rt, "k", "j", ["a"], ["b"]).take_all()
    )
    h = sorted(
        (int(r["_k"]), int(r["a"]), int(r["b"]))
        for r in hash_equi_join(lt, rt, "k", "j", ["a"], ["b"]).take_all()
    )
    assert b == h and len(b) > 0


def test_connected_components_plans_agree(ray_ready):
    """Single-task vectorized CC ≡ iterative distributed hash-min +
    pointer-jumping rounds, on a random graph with chains, cliques and
    singleton edges; both match a brute-force union-find."""
    import ray.data

    from engine.ops.graph import connected_components

    rng = np.random.default_rng(13)
    a = rng.integers(0, 400, size=600).astype(np.int64)
    b = rng.integers(0, 400, size=600).astype(np.int64)
    keep = a != b
    t = pa.table({"a": pa.array(a[keep]), "b": pa.array(b[keep])})
    small = sorted(
        (int(r["doc_id"]), int(r["cluster_id"]))
        for r in connected_components(ray.data.from_arrow(t)).take_all()
    )
    # BSP task rounds forced on the SAME random graph (small_graph_rows=0
    # flips the plan at the threshold boundary: count > budget)
    big = sorted(
        (int(r["doc_id"]), int(r["cluster_id"]))
        for r in connected_components(
            ray.data.from_arrow(t), small_graph_rows=0, num_parts=8
        ).take_all()
    )
    assert big == small
    # threshold boundary: budget == edge count stays on the single-task
    # plan; budget == edge count - 1 takes the BSP plan — same answer
    n_edges = int(keep.sum())
    at = sorted(
        (int(r["doc_id"]), int(r["cluster_id"]))
        for r in connected_components(
            ray.data.from_arrow(t), small_graph_rows=n_edges
        ).take_all()
    )
    above = sorted(
        (int(r["doc_id"]), int(r["cluster_id"]))
        for r in connected_components(
            ray.data.from_arrow(t), small_graph_rows=n_edges - 1, num_parts=4
        ).take_all()
    )
    assert at == small and above == small
    # brute union-find
    parent = {}
    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for x, y in zip(a[keep], b[keep]):
        rx, ry = find(int(x)), find(int(y))
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)
    want = sorted((n, find(n)) for n in parent)
    assert small == want


def test_hash_equi_join_outer_types(ray_ready):
    """left/right/full outer joins vs brute force (unmatched rows keep
    nulls on the other side; key co-location makes them partition-local)."""
    import ray.data

    from engine.rayds.shuffle import hash_equi_join

    lt = ray.data.from_arrow(
        pa.table({"k": pa.array([1, 2, 2, 5], type=pa.int64()),
                  "a": pa.array([10, 20, 21, 50], type=pa.int64())})
    )
    rt = ray.data.from_arrow(
        pa.table({"j": pa.array([2, 3], type=pa.int64()),
                  "b": pa.array([200, 300], type=pa.int64())})
    )

    def rows(jt):
        return sorted(
            (int(r["_k"]),
             None if r["a"] is None else int(r["a"]),
             None if r["b"] is None else int(r["b"]))
            for r in hash_equi_join(lt, rt, "k", "j", ["a"], ["b"],
                                    join_type=jt).take_all()
        )

    assert rows("left outer") == [(1, 10, None), (2, 20, 200),
                                  (2, 21, 200), (5, 50, None)]
    assert rows("right outer") == [(2, 20, 200), (2, 21, 200),
                                   (3, None, 300)]
    assert rows("full outer") == [(1, 10, None), (2, 20, 200),
                                  (2, 21, 200), (3, None, 300),
                                  (5, 50, None)]


def test_equi_join_broadcast_outer_matches_hash(ray_ready):
    """Adaptive broadcast outer plans ≡ hash-exchange outer plans."""
    import ray.data

    from engine.rayds.shuffle import equi_join, hash_equi_join

    rng = np.random.default_rng(17)
    lt = ray.data.from_arrow(pa.table({
        "k": pa.array(rng.integers(0, 30, size=500), type=pa.int64()),
        "a": pa.array(np.arange(500), type=pa.int64())}))
    rt = ray.data.from_arrow(pa.table({
        "j": pa.array(rng.integers(15, 45, size=200), type=pa.int64()),
        "b": pa.array(np.arange(200), type=pa.int64())}))
    for jt in ("left outer", "right outer"):
        adaptive = sorted(
            (int(r["_k"]),
             None if r["a"] is None else int(r["a"]),
             None if r["b"] is None else int(r["b"]))
            for r in equi_join(lt, rt, "k", "j", ["a"], ["b"],
                               join_type=jt).take_all()
        )
        hashed = sorted(
            (int(r["_k"]),
             None if r["a"] is None else int(r["a"]),
             None if r["b"] is None else int(r["b"]))
            for r in hash_equi_join(lt, rt, "k", "j", ["a"], ["b"],
                                    join_type=jt).take_all()
        )
        assert adaptive == hashed and len(adaptive) > 0


def test_hash_equi_join_empty_side(ray_ready):
    """Empty (schema-less in Ray 2.49) sides must not crash the join:
    inner → empty; left outer → left preserved with nulls."""
    import ray.data
    import pyarrow.compute as pc

    from engine.rayds.shuffle import hash_equi_join

    lt = ray.data.from_arrow(
        pa.table({"k": pa.array([1, 2], type=pa.int64()),
                  "a": pa.array([10, 20], type=pa.int64())})
    )
    # empty via a filter that drops every row (schema lost downstream)
    rt = ray.data.from_arrow(
        pa.table({"j": pa.array([9], type=pa.int64()),
                  "b": pa.array([90], type=pa.int64())})
    ).map_batches(
        lambda t: t.filter(pc.equal(t["j"], -1)),
        batch_format="pyarrow", batch_size=None,
    )
    assert hash_equi_join(lt, rt, "k", "j", ["a"], ["b"]).count() == 0
    lo = sorted(
        (int(r["_k"]), int(r["a"]), r["b"])
        for r in hash_equi_join(lt, rt, "k", "j", ["a"], ["b"],
                                join_type="left outer").take_all()
    )
    assert lo == [(1, 10, None), (2, 20, None)]


def test_anti_join_plans_agree(ray_ready, monkeypatch):
    """The broadcast anti plan (driver-folded distinct + is_in filter)
    and the cogroup fallback (budget forced to 0) produce the identical
    unmatched-id set."""
    from engine.rayds import pipeline

    sf = "/root/testdata/sf0.001"
    bcast = {r["image_id"] for r in pipeline.semi_anti_ids(sf, anti=True).take_all()}
    monkeypatch.setattr(pipeline, "ANTI_BROADCAST_MAX_IDS", 0)
    cogroup = {r["image_id"] for r in pipeline.semi_anti_ids(sf, anti=True).take_all()}
    assert bcast == cogroup and len(bcast) > 0
    # semi + anti partition the image table
    semi = {r["image_id"] for r in pipeline.semi_anti_ids(sf, anti=False).take_all()}
    from engine.rayds.imagetab import image_dataset

    total = image_dataset(sf).count()
    assert len(semi) + len(bcast) == total and not (semi & bcast)


def test_sessionize_split_hot_key_matches_brute(ray_ready):
    """VERDICT r2 #5: time-range pre-split sessionization. One hot key
    holds ~10^6 events — far beyond the per-partition budget the plain
    ``sessionize`` assumes — split across time buckets and stitched at
    boundaries.  The bucket cap is ENFORCED by construction (asserted
    below) and the result must equal a vectorized driver-side brute
    force; normal keys ride along to exercise the mixed path."""
    import ray.data

    from engine.rayds.shuffle import sessionize_split

    rng = np.random.default_rng(11)
    HOT_N, GAP, BUCKET = 1_000_000, 5_000, 10_000_000
    # hot key 7: inter-arrival mixture so sessions BOTH chain across
    # bucket edges and break inside buckets
    gaps = np.where(rng.random(HOT_N) < 0.001,
                    rng.integers(GAP + 1, 40 * GAP, HOT_N),
                    rng.integers(1, 2_000, HOT_N))
    hot_ts = np.cumsum(gaps).astype(np.int64)
    cold_n = 20_000
    cold_u = rng.integers(100, 120, cold_n).astype(np.int64)
    cold_ts = rng.integers(0, int(hot_ts[-1]), cold_n).astype(np.int64)
    users = np.concatenate([np.full(HOT_N, 7, dtype=np.int64), cold_u])
    ts = np.concatenate([hot_ts, cold_ts])
    cents = rng.integers(-10, 100, len(users)).astype(np.int64)
    # enforced partition cap: no (key, bucket) holds more than CAP events
    CAP = 120_000
    _, per_bucket = np.unique(users * (ts // BUCKET + 1_000_000), return_counts=True)
    assert per_bucket.max() < CAP < HOT_N  # the hot key NEEDS the split
    t = pa.table({"user_id": pa.array(users), "ts_us": pa.array(ts),
                  "cents": pa.array(cents)})
    got = {
        (int(r["user_id"]), int(r["session_start_us"])):
            (int(r["n_events"]), int(r["sum_cents"]))
        for r in sessionize_split(
            ray.data.from_arrow(t), "user_id", "ts_us", gap_us=GAP,
            sum_col="cents", bucket_us=BUCKET).take_all()
    }
    # vectorized brute force (independent of the engine code path)
    order = np.lexsort((ts, users))
    su, st, sc = users[order], ts[order], cents[order]
    new_s = np.ones(len(su), dtype=bool)
    new_s[1:] = (su[1:] != su[:-1]) | ((st[1:] - st[:-1]) > GAP)
    starts = np.nonzero(new_s)[0]
    cnts = np.diff(np.append(starts, len(su)))
    sums = np.add.reduceat(sc, starts)
    want = {
        (int(su[s]), int(st[s])): (int(c), int(v))
        for s, c, v in zip(starts, cnts, sums)
    }
    assert len(want) > 1000  # plenty of sessions, incl. cross-bucket ones
    assert got == want


def test_asof_join_split_matches_plain(ray_ready):
    """Time-range pre-split as-of join (broadcast bucket-carry) equals
    the co-partitioned plan on tie-free data where one hot key's volume
    would break the per-partition assumption, including lefts whose
    match lives MANY empty buckets earlier."""
    import ray.data

    from engine.ops.asof import asof_join, asof_join_split

    rng = np.random.default_rng(5)
    n = 120_000
    uid = np.concatenate([
        np.full(n, 3, dtype=np.int64),               # hot key
        rng.integers(50, 70, 5_000).astype(np.int64)  # normal keys
    ])
    # unique ts per user -> deterministic matches regardless of plan
    ts = np.arange(len(uid), dtype=np.int64) * 17 + rng.integers(0, 7, len(uid))
    ts = ts * 1000
    # sparse views: long right-free stretches force carry lookups far back
    et = np.where(rng.random(len(uid)) < 0.01, "view", "click")
    t = pa.table({
        "event_id": pa.array(np.arange(len(uid), dtype=np.int64)),
        "user_id": pa.array(uid),
        "ts": pa.array(ts),
        "event_type": pa.array(et),
    })
    ds = ray.data.from_arrow(t)
    plain = {int(r["event_id"]): int(r["match_id"])
             for r in asof_join(ds, "click", "view").take_all()}
    BUCKET = 2_000_000  # ~117 events per (key, bucket) for the hot key
    split = {int(r["event_id"]): int(r["match_id"])
             for r in asof_join_split(ds, "click", "view",
                                      bucket_us=BUCKET).take_all()}
    assert len(plain) > 50_000
    assert split == plain


def test_asof_join_split_matches_brute_sf(ray_ready):
    """The split plan on the real events table equals the plain plan
    (which test_asof_join_matches_brute pins to brute force)."""
    import ray.data

    from engine.ops.asof import asof_join, asof_join_split

    t = pq.read_table(f"{SF}/events.parquet",
                      columns=["event_id", "user_id", "ts", "event_type"])
    ds = ray.data.from_arrow(t)
    plain = {int(r["event_id"]): int(r["match_id"])
             for r in asof_join(ds, "click", "view").take_all()}
    split = {int(r["event_id"]): int(r["match_id"])
             for r in asof_join_split(ds, "click", "view",
                                      bucket_us=3_600_000_000).take_all()}
    assert split == plain and len(plain) > 0


def test_interval_join_matches_brute(ray_ready):
    """Time-bucket interval join vs brute-force O(n^2) overlap test —
    random interval lengths up to 40 buckets force heavy replication and
    exercise the overlap-start dedupe rule (no duplicate pairs)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from engine.ops.interval import interval_join

    rng = np.random.default_rng(23)
    B = 100  # tiny buckets so most intervals span many
    nl, nr = 400, 300
    l0 = rng.integers(0, 20_000, size=nl).astype(np.int64)
    l1 = l0 + rng.integers(0, 4_000, size=nl)
    r0 = rng.integers(0, 20_000, size=nr).astype(np.int64)
    r1 = r0 + rng.integers(0, 4_000, size=nr)
    lt = pa.table({"_id": pa.array(np.arange(nl, dtype=np.int64)),
                   "_t0": pa.array(l0), "_t1": pa.array(l1)})
    rt = pa.table({"_id": pa.array(np.arange(nr, dtype=np.int64)),
                   "_t0": pa.array(r0), "_t1": pa.array(r1)})
    out = interval_join(
        ray.data.from_arrow(lt).repartition(5),
        ray.data.from_arrow(rt).repartition(3),
        bucket_us=B, id_cols=("l", "r"),
    ).take_all()
    got = [(int(x["l"]), int(x["r"])) for x in out]
    assert len(got) == len(set(got))  # dedupe rule held
    m = (l0[:, None] <= r1[None, :]) & (r0[None, :] <= l1[:, None])
    a, b = np.nonzero(m)
    assert sorted(got) == sorted(zip(a.tolist(), b.tolist()))


def test_mrl_quantiles_guaranteed_bound(ray_ready):
    """Distributed MRL sketch: every returned quantile's TRUE rank must
    be within the sketch's self-certified ±err bound; the bound itself
    must be nontrivial (compactions really happened) and small."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from engine.ops.sketch import MRLSketch, mrl_quantiles

    rng = np.random.default_rng(9)
    data = rng.lognormal(0.0, 2.0, size=200_000)
    ds = ray.data.from_arrow(pa.table({"v": pa.array(data)})).repartition(13)
    qs = [0.05, 0.25, 0.5, 0.75, 0.95]
    vals, n, err = mrl_quantiles(ds, "v", qs, k=256)
    assert n == len(data)
    assert 0 < err < 0.05 * n  # compactions happened; bound stays tight
    sd = np.sort(data)
    for q, est in zip(qs, vals):
        true_rank = np.searchsorted(sd, est)
        assert abs(true_rank - q * n) <= err, (q, true_rank, q * n, err)
    # merge associativity of the serialized form: fold in two different
    # groupings -> identical (deterministic compaction, same order)
    a = MRLSketch(64).insert(data[:70_000])
    b = MRLSketch(64).insert(data[70_000:150_000])
    c = MRLSketch(64).insert(data[150_000:])
    ab_c = MRLSketch(64).merge(a).merge(b).merge(c)
    assert ab_c.n == len(data)
    sd2 = np.sort(data)
    for q in qs:
        est = ab_c.quantile([q])[0]
        r = np.searchsorted(sd2, est)
        assert abs(r - q * len(data)) <= ab_c.err


def test_ordered_cumsum_scan(ray_ready):
    """Two-phase distributed scan == numpy cumsum across many blocks;
    overlapping block key ranges must be rejected."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from engine.ops.scan import ordered_cumsum

    n = 50_000
    v = np.random.default_rng(4).integers(1, 100, size=n).astype(np.int64)
    t = pa.table({"k": pa.array(np.arange(n, dtype=np.int64)),
                  "v": pa.array(v)})
    # split=true repartition keeps row order -> contiguous key ranges
    ds = ray.data.from_arrow(t).repartition(17)
    out = ordered_cumsum(ds, "k", "v", out_col="c").take_all()
    got = np.empty(n, dtype=np.int64)
    for r in out:
        got[r["k"]] = r["c"]
    want = np.cumsum(v) - v
    assert np.array_equal(got, want)
    # interleaved keys across blocks -> must raise
    t2 = pa.table({"k": pa.array([0, 2, 1, 3], type=pa.int64()),
                   "v": pa.array([1, 1, 1, 1], type=pa.int64())})
    shuffled = ray.data.from_arrow(t2).repartition(2)
    import pytest as _pytest
    with _pytest.raises(Exception):
        ordered_cumsum(shuffled, "k", "v").take_all()


def test_write_hash_partitioned_colocation(ray_ready, tmp_path):
    """Clustered sink: every row in part=<p> hashes to p under the
    engine's shuffle hash (so later joins on the key are exchange-free),
    and the union of partitions equals the input."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from engine.rayds import ckpt
    from engine.rayds.shuffle import _col_hash

    n = 20_000
    t = pa.table({
        "k": pa.array((np.arange(n) * 7919) % 501),
        "v": pa.array(np.arange(n, dtype=np.int64)),
    })
    out = str(tmp_path / "clustered")
    res = ckpt.write_hash_partitioned(
        ray.data.from_arrow(t).repartition(8), out, ["k"], num_parts=16
    )
    assert res["rows"] == n and res["parts"] >= 2
    got = []
    for name in os.listdir(out):
        if not name.startswith("part="):
            continue
        p = int(name.split("=")[1])
        d = os.path.join(out, name)
        for f in os.listdir(d):
            if f.endswith(".parquet"):
                tt = pq.read_table(os.path.join(d, f))
                h = (_col_hash(tt["k"]) % np.uint64(16)).astype(np.int64)
                assert (h == p).all()
                got += list(zip(tt["k"].to_pylist(), tt["v"].to_pylist()))
    assert sorted(got) == sorted(zip(t["k"].to_pylist(), t["v"].to_pylist()))


def test_asof_split_left_bucket_past_rights_range(ray_ready):
    """Regression (found by review, previously REPRODUCED failing): a
    left event whose bucket lies >= 2 buckets past the globally last
    right must still match its key's carry — the old (uid*span + offset)
    encoding overflowed into the next key's block and dropped the match;
    and co-resident lefts past the range must never alias another key's
    segment in the local sweep."""
    import datetime

    import pyarrow as pa
    import ray.data

    from engine.ops.asof import asof_join, asof_join_split

    base = datetime.datetime(2024, 1, 1)

    def ev(eid, uid, off_us, etype):
        return {"event_id": eid, "user_id": uid,
                "ts": base + datetime.timedelta(microseconds=off_us),
                "event_type": etype, "value": 0.0, "props": "{}"}

    rows = [
        ev(1, 0, 100, "view"),        # right, bucket 0
        ev(2, 0, 5_500, "click"),     # left, bucket 5 (>= bmax+2)
        ev(3, 1, 1_500, "view"),      # right, bucket 1 (other key)
        ev(4, 1, 9_900, "click"),     # left far past range, other key
        ev(5, 2, 7_700, "click"),     # left with NO rights for its key
    ]
    t = pa.Table.from_pylist(rows)
    ds = ray.data.from_arrow(t)
    got_plain = sorted(
        (r["event_id"], r["match_id"])
        for r in asof_join(ds, "click", "view").take_all()
    )
    got_split = sorted(
        (r["event_id"], r["match_id"])
        for r in asof_join_split(
            ray.data.from_arrow(t), "click", "view", bucket_us=1000
        ).take_all()
    )
    assert got_split == got_plain
    assert (2, 1) in got_split and (4, 3) in got_split
    assert not any(e == 5 for e, _ in got_split)


def test_dedup_canonical_plans_agree(ray_ready, monkeypatch):
    """dedup_canonical's broadcast plan == the past-budget distributed
    cogroup fallback (forced via a 0 drop budget)."""
    import __ray_entry__ as e

    a = sorted(r["doc_id"] for r in e.queries()["dedup_canonical"](SF).take_all())
    monkeypatch.setattr(e, "DEDUP_DROP_BUDGET", 0)
    b = sorted(r["doc_id"] for r in e.queries()["dedup_canonical"](SF).take_all())
    assert a == b and len(a) > 0


def test_s2_cover_global_level_window(ray_ready):
    """Heterogeneous polygon sizes (continent + city-block) must not
    union into an unbounded cover level set: the point side replicates
    once per used level, so s2_layer_cover clamps all covers into one
    global window of <= S2_COVER_LEVEL_SPAN levels (coarsening is a
    superset, so join exactness is preserved by the PIP refinement)."""
    import numpy as np

    from engine.rayds.celljoin import S2_COVER_LEVEL_SPAN, s2_layer_cover
    from engine.rayds.imagetab import Layer

    bounds = np.array([
        [0.0, 0.0, 90.0, 90.0],
        [10.0, 10.0, 10.01, 10.01],
        [50.0, 50.0, 50.005, 50.005],
    ], dtype=np.float64)
    layer = Layer(poly_ids=np.arange(3, dtype=np.int64), bounds=bounds,
                  sides=bounds[:, 2] - bounds[:, 0])
    rows, keys, used = s2_layer_cover(layer)
    assert 0 < len(used) <= S2_COVER_LEVEL_SPAN
    # disjointness within each polygon survives the clamp: no cover cell
    # may be an ancestor of another of the same polygon
    from engine.geo import cells as C
    for p in range(3):
        ids = keys[rows == p]
        lv = np.asarray(C.s2_level(ids))
        idset = set(ids.tolist())
        for L in sorted(set(int(v) for v in lv))[:-1]:
            finer = ids[lv > L]
            if len(finer):
                anc = np.asarray(C.s2_parent(finer, L))
                assert not any(int(a) in idset for a in anc), (p, L)


def test_equi_join_accepts_table_sides(ray_ready):
    """A driver-resident pa.Table on either side of the adaptive
    equi_join ≡ the all-Dataset hash join (broadcast when it fits, hash
    plan via from_arrow when forced past the budget)."""
    import ray.data

    from engine.rayds import shuffle
    from engine.rayds.shuffle import equi_join, hash_equi_join

    rng = np.random.default_rng(11)
    lk = rng.integers(0, 40, size=250)
    rk = rng.integers(20, 60, size=3000)
    ltab = pa.table({"k": pa.array(lk), "a": pa.array(np.arange(250))})
    rds = ray.data.from_arrow(
        pa.table({"j": pa.array(rk), "b": pa.array(np.arange(3000))})
    )
    want = sorted(
        (int(r["_k"]), int(r["a"]), int(r["b"]))
        for r in hash_equi_join(
            ray.data.from_arrow(ltab), rds, "k", "j", ["a"], ["b"]
        ).take_all()
    )
    assert len(want) > 0
    # table as LEFT (broadcast fits)
    got = sorted(
        (int(r["_k"]), int(r["a"]), int(r["b"]))
        for r in equi_join(ltab, rds, "k", "j", ["a"], ["b"]).take_all()
    )
    assert got == want
    # table as RIGHT
    got = sorted(
        (int(r["_k"]), int(r["a"]), int(r["b"]))
        for r in equi_join(rds, ltab, "j", "k", ["b"], ["a"]).take_all()
    )
    assert got == want
    # forced past the budget → hash plan on a from_arrow conversion
    old = shuffle.BROADCAST_JOIN_MAX_ROWS
    shuffle.BROADCAST_JOIN_MAX_ROWS = 10
    try:
        got = sorted(
            (int(r["_k"]), int(r["a"]), int(r["b"]))
            for r in equi_join(
                ltab, rds, "k", "j", ["a"], ["b"], num_parts=8
            ).take_all()
        )
    finally:
        shuffle.BROADCAST_JOIN_MAX_ROWS = old
    assert got == want


def test_dim_table_reads_and_enforces_budget(ray_ready, tmp_path):
    import pyarrow.parquet as pq
    import pytest

    from engine.rayds.shuffle import dim_table

    p = str(tmp_path / "dim.parquet")
    pq.write_table(
        pa.table({"k": pa.array([1, 2, 3]), "v": pa.array(["a", "b", "c"])}), p
    )
    t = dim_table(p, ["k", "v"])
    assert t.num_rows == 3 and t.column_names == ["k", "v"]
    with pytest.raises(ValueError):
        dim_table(p, ["k"], budget=2)


def test_probe_small_meta_fast_path(ray_ready):
    """Pure reads / from_arrow datasets probe via metadata count and
    return the ORIGINAL dataset (no execution, no prefix copy); mapped
    upstreams fall back to the bounded materialized prefix."""
    import ray.data

    from engine.rayds.shuffle import _probe_small

    tab = pa.table({"x": pa.array(np.arange(100))})
    ds = ray.data.from_arrow(tab)
    fits, small = _probe_small(ds, budget=1000)
    assert fits and small is ds
    fits, small = _probe_small(ds, budget=10)
    assert not fits and small is None
    # a pa.Table probes by num_rows
    fits, small = _probe_small(tab, budget=1000)
    assert fits and small is tab
    # mapped upstream: meta count unknown → materialized prefix
    mapped = ds.map_batches(lambda b: b, batch_format="pyarrow")
    fits, small = _probe_small(mapped, budget=1000)
    assert fits and small is not mapped and small.count() == 100


def test_grouped_agg_plans_match_brute(ray_ready):
    """Combiner-first grouped_agg (tree AND shuffle plans) ≡ a single
    pyarrow group_by over the whole table, for every decomposable
    aggregate kind."""
    import ray.data

    from engine.rayds.shuffle import grouped_agg

    rng = np.random.default_rng(7)
    n = 20_000
    tab = pa.table({
        "g": pa.array(rng.integers(0, 37, size=n)),
        "v": pa.array(rng.integers(-1000, 1000, size=n)),
        "w": pa.array(rng.integers(0, 10**9, size=n)),
    })
    want = {
        int(r["g"]): (int(r["v_sum"]), int(r["v_min"]), int(r["w_max"]))
        for r in tab.group_by(["g"]).aggregate(
            [("v", "sum"), ("v", "min"), ("w", "max")]
        ).rename_columns(["g", "v_sum", "v_min", "w_max"]).to_pylist()
    }
    ds = ray.data.from_arrow(tab).repartition(13)
    for plan in ("tree", "shuffle"):
        out = grouped_agg(
            ds, ["g"], [("v", "sum"), ("v", "min"), ("w", "max")],
            ["sv", "mv", "mw"], plan=plan,
        )
        got = {
            int(r["g"]): (int(r["sv"]), int(r["mv"]), int(r["mw"]))
            for r in out.take_all()
        }
        assert got == want, plan


# ------------------------------------------------------------------ zonal
def test_zonal_stats_matches_brute(ray_ready):
    """Brute force: decode(encode(synth)) per image driver-side (the
    same codec path the stage runs, so lossy qraw parity is exact by
    construction), then Python-dict grouping over the brute pairs."""
    from engine.img import codec
    from engine.rayds.imagetab import derive_batch
    from engine.rayds.zonal import zonal_stats

    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_id", "event_type"])
    imgs = derive_batch(ev)
    per_img = {}
    for i in range(imgs.num_rows):
        iid = imgs["image_id"][i].as_py()
        w, h = imgs["w"][i].as_py(), imgs["h"][i].as_py()
        fmt = imgs["fmt"][i].as_py()
        img = codec.synth_image_batch([iid], w, h)[0]
        if fmt == "raw":
            payload = img.tobytes()
        elif fmt == "png":
            payload = codec.png_encode(img)
        else:
            payload = codec.qraw_encode(img)
        dec = codec.decode_payload(payload, w, h, fmt).astype(np.int64)
        per_img[iid] = (int(dec.sum()), dec.size, int(dec.min()),
                        int(dec.max()))
    want = {}
    for iid, pid in _brute_pairs(SF, "covers"):
        s, c, lo, hi = per_img[iid]
        cur = want.get(pid)
        if cur is None:
            want[pid] = [1, c, s, lo, hi]
        else:
            cur[0] += 1
            cur[1] += c
            cur[2] += s
            cur[3] = min(cur[3], lo)
            cur[4] = max(cur[4], hi)

    rows = zonal_stats(SF).take_all()
    assert len(rows) == len(want)
    for r in rows:
        n, npx, s, lo, hi = want[int(r["poly_id"])]
        assert (int(r["n_images"]), int(r["n_px"]), int(r["sum_px"]),
                int(r["min_px"]), int(r["max_px"])) == (n, npx, s, lo, hi)
        assert r["mean_px"] == s / float(npx)


# ---------------------------------------------------------------- pyramid
def test_quad_pyramid_matches_brute_and_plans_agree(ray_ready):
    import ray.data

    from engine.rayds.pyramid import quad_pyramid

    rng = np.random.default_rng(7)
    n = 20_000
    x = rng.uniform(0, 100, n)
    y = rng.uniform(0, 100, n)
    ds = ray.data.from_arrow(pa.table({"x": x, "y": y})).repartition(9)
    zmax = 5
    want = {}
    cx = np.floor(x * (1 << zmax) / 100.0).astype(np.int64)
    cy = np.floor(y * (1 << zmax) / 100.0).astype(np.int64)
    for z in range(zmax, -1, -1):
        for a, b in zip(cx >> (zmax - z), cy >> (zmax - z)):
            want[(z, int(a), int(b))] = want.get((z, int(a), int(b)), 0) + 1
    for plan in ("tree", "shuffle"):
        got = {(r["z"], r["qx"], r["qy"]): r["n"]
               for r in quad_pyramid(ds, "x", "y", zmax=zmax,
                                     plan=plan).take_all()}
        assert got == want, plan
    # per-level invariant: every level sums to n
    lvl = {}
    for (z, _, _), c in want.items():
        lvl[z] = lvl.get(z, 0) + c
    assert all(v == n for v in lvl.values())


def test_checkpoint_resume_curation(ray_ready, tmp_path):
    """The curation chain under fp-hash-shard manifests: per-shard
    keep-lowest sets are globally complete per key; union == the
    unsharded curation_pipeline, and a deleted manifest recomputes
    exactly one shard."""
    import __ray_entry__ as e
    from engine.rayds import ckpt, pipeline

    out = str(tmp_path / "cur_out")
    r1 = pipeline.run_curation_checkpointed(SF, out, num_shards=3)
    assert r1["computed"] == [0, 1, 2]
    os.remove(ckpt.manifest_path(out, 1))
    r2 = pipeline.run_curation_checkpointed(SF, out, num_shards=3)
    assert r2 == {"computed": [1], "skipped": [0, 2]}
    import pyarrow.parquet as pq
    got = set()
    for i in range(3):
        d = os.path.join(out, f"shard={i}")
        for f in os.listdir(d):
            if f.endswith(".parquet"):
                t = pq.read_table(os.path.join(d, f))
                got |= set(zip(t["fp"].to_pylist(),
                               t["doc_id"].to_pylist(),
                               t["n_tokens"].to_pylist()))
    want = {
        (r["fp"], r["doc_id"], r["n_tokens"])
        for r in e.queries()["curation_pipeline"](SF).take_all()
    }
    assert got == want
    assert len(want) > 0


def test_polygon_blob_roundtrip():
    """PolygonArray.to_blobs/from_blobs must be a lossless wire format,
    including polygons with holes and a take() gather."""
    import numpy as np

    from engine.geo.ragged import PolygonArray

    shell = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], float)
    hole = np.array([[4, 4], [4, 6], [6, 6], [6, 4], [4, 4]], float)
    tri = np.array([[20, 20], [25, 20], [22, 27], [20, 20]], float)
    coords = np.vstack([shell, hole, tri])
    arr = PolygonArray(coords, np.array([0, 5, 10, 14]), np.array([0, 2, 3]))
    rt = PolygonArray.from_blobs(arr.to_blobs())
    assert np.array_equal(rt.coords, arr.coords)
    assert np.array_equal(rt.ring_offsets, arr.ring_offsets)
    assert np.array_equal(rt.poly_offsets, arr.poly_offsets)
    # take: gather polygon 1 only (the triangle)
    one = arr.take(np.array([1]))
    assert np.array_equal(one.coords, tri)
    assert np.array_equal(one.poly_offsets, [0, 1])


def test_cellpart_join_dataset_native_layer(ray_ready):
    """The polygon side as a lazy Dataset (dense_layer_dataset — never
    materialized on the driver) must match the broadcast plan over the
    identical driver-side Layer (dense_layer_collect)."""
    from engine.rayds import pipeline
    from engine.rayds.celljoin import cellpart_pairs
    from engine.rayds.imagetab import dense_layer_collect, dense_layer_dataset

    kw = dict(n_polys=150, verts=12, radius=5.0, seed=11)
    a = {
        (r["image_id"], int(r["poly_id"]))
        for r in cellpart_pairs(SF, layer_ds=dense_layer_dataset(**kw)).take_all()
    }
    b = {
        (r["image_id"], int(r["poly_id"]))
        for r in pipeline.pairs_dataset(SF, layer=dense_layer_collect(**kw))
        .select_columns(["image_id", "poly_id"]).take_all()
    }
    assert len(b) > 0 and a == b


def test_s2part_hexpart_dataset_native_layer(ray_ready):
    """S2- and hex-keyed big-big joins over a Dataset polygon side must
    match the broadcast plan (two-pass global S2 level window included)."""
    from engine.rayds import pipeline
    from engine.rayds.celljoin import hexpart_pairs, s2part_pairs
    from engine.rayds.imagetab import dense_layer_collect, dense_layer_dataset

    kw = dict(n_polys=60, verts=8, radius=6.0, seed=3)
    want = {
        (r["image_id"], int(r["poly_id"]))
        for r in pipeline.pairs_dataset(SF, layer=dense_layer_collect(**kw))
        .select_columns(["image_id", "poly_id"]).take_all()
    }
    got_s2 = {
        (r["image_id"], int(r["poly_id"]))
        for r in s2part_pairs(SF, layer_ds=dense_layer_dataset(**kw)).take_all()
    }
    got_hex = {
        (r["image_id"], int(r["poly_id"]))
        for r in hexpart_pairs(SF, layer_ds=dense_layer_dataset(**kw)).take_all()
    }
    assert len(want) > 0 and got_s2 == want and got_hex == want


def test_choose_part_cell_groups_per_slot():
    """Auto-tuned granularity must land >=4 groups per reducer slot
    across heterogeneous layer extents (unless the polygon-size clamp
    binds, which trades group count for bounded replication)."""
    from engine.rayds.celljoin import TARGET_GROUPS_PER_SLOT, choose_part_cell

    for bounds, mean_side in [
        ((0.0, 0.0, 100.0, 100.0), 0.5),        # small polys, unit world
        ((-180.0, -90.0, 180.0, 90.0), 0.1),    # planet extent
        ((5.0, 5.0, 6.0, 6.0), 0.001),          # city-block extent
    ]:
        for slots in (4, 32, 256):
            cell = choose_part_cell(
                {"n": 1000, "bounds": bounds, "mean_side": mean_side},
                slots=slots,
            )
            w = bounds[2] - bounds[0]
            h = bounds[3] - bounds[1]
            groups = (w / cell) * (h / cell)
            assert groups >= TARGET_GROUPS_PER_SLOT * slots * 0.99, (
                bounds, slots, cell, groups)
            # replication clamp: cell never finer than half the mean side
            assert cell >= mean_side / 2


def test_checkpoint_resume_keyed_joins(ray_ready, tmp_path):
    """S2- and hex-keyed big-big joins under manifests: resume recomputes
    exactly the failed shard; shard outputs partition the unsharded join."""
    import pyarrow.parquet as pq

    from engine.rayds import ckpt, pipeline
    from engine.rayds.celljoin import hexpart_pairs, s2part_pairs

    for plan, pairs_fn in (("s2", s2part_pairs), ("hex", hexpart_pairs)):
        out = str(tmp_path / f"kj_{plan}")
        r1 = pipeline.run_keyedjoin_checkpointed(SF, out, num_shards=2,
                                                 plan=plan)
        assert r1["computed"] == [0, 1]
        os.remove(ckpt.manifest_path(out, 1))
        r3 = pipeline.run_keyedjoin_checkpointed(SF, out, num_shards=2,
                                                 plan=plan)
        assert r3 == {"computed": [1], "skipped": [0]}
        got = set()
        for i in range(2):
            d = os.path.join(out, f"shard={i}")
            for f in os.listdir(d):
                if f.endswith(".parquet"):
                    t = pq.read_table(os.path.join(d, f),
                                      columns=["image_id", "poly_id"])
                    got |= set(zip(t["image_id"].to_pylist(),
                                   t["poly_id"].to_pylist()))
        want = {(r["image_id"], r["poly_id"])
                for r in pairs_fn(SF).take_all()}
        assert got == want and len(want) > 0


def test_curation_full_resume(ray_ready, tmp_path):
    """The full curation chain (gates → exact dedup → near-dup →
    decontamination) under chained phase manifests: a deleted phase-2
    manifest re-runs only phases 2-3; row counts shrink monotonically."""
    from engine.rayds import ckpt, pipeline

    out = str(tmp_path / "cur_full")
    r = pipeline.run_curation_full(SF, out, num_shards=2)
    assert r["phase1"]["computed"] == [0, 1]
    assert (r["rows_after_phase1"] >= r["rows_after_phase2"]
            >= r["rows_after_phase3"] > 0)
    os.remove(ckpt.manifest_path(os.path.join(out, "phase2"), 0))
    r2 = pipeline.run_curation_full(SF, out, num_shards=2)
    assert r2["phase1"] == {"computed": [], "skipped": [0, 1]}
    assert r2["phase2"]["computed"] == [0]
    # phase 3's fingerprint chains phase 2's manifest file → recomputed
    assert r2["phase3"]["computed"] == [0]
    assert r2["rows_after_phase3"] == r["rows_after_phase3"]
