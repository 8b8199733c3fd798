"""Flagship pipeline: read → cell encode → two-phase join → tiling → sink.

The Ray-Data realization of the north star: the reference's
``STRtree(polys).query(points, predicate)`` bulk join (strtree.py:108)
plus per-cell raster tiling, as a streaming Dataset pipeline — the
polygon layer is broadcast ONCE via ``ray.put`` and indexed per actor
(prepared-geometry semantics), image rows stream through zero-copy Arrow
batches, and the only wide exchange is the (combiner-reduced) tile-count
groupby.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from engine.rayds import ckpt, shuffle
from engine.rayds.imagetab import Layer, image_dataset, load_layer
from engine.rayds.stages import (
    DwithinRefiner,
    JoinRefiner,
    NearestCenterStage,
    _resolve,
    cell_encode,
    make_tile_assign,
)

# Broadcast budget for the anti-join matched-id set (~tens of MB of ids;
# past this the exact cogroup fallback takes over).
ANTI_BROADCAST_MAX_IDS = 2_000_000

# actor-pool sizing: autoscale up to ~half the cluster CPUs (measured
# optimum at 32 CPUs — leaves headroom for the fused read/derive tasks
# and the downstream tile/shuffle tasks so no stage starves another).
# At multi-node scale this becomes concurrency=(nodes, nodes*cores/2).
JOIN_BATCH = 16384


def _join_concurrency() -> tuple[int, int]:
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return (1, max(4, cpus // 2))


def pairs_dataset(sf_dir: str, predicate: str = "covers", layer: Layer | None = None,
                  keep_cols=("image_id",), ds=None, use_actors: bool = False):
    """image × polygon-layer inner join pairs (lazy Dataset).

    Default path: task-based map_batches with a per-worker cached
    prepared index (elastic, no pool sizing); ``use_actors=True`` runs
    the same kernel as an explicit actor pool (``JoinRefiner``)."""
    import ray

    from engine.rayds.stages import make_join_fn

    layer = layer or load_layer(sf_dir)
    ref = ray.put(layer)
    ds = ds if ds is not None else image_dataset(sf_dir)
    if use_actors:
        return ds.map_batches(
            JoinRefiner,
            fn_constructor_kwargs={"layer_ref": ref, "predicate": predicate,
                                   "keep_cols": keep_cols},
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=JOIN_BATCH,
            concurrency=_join_concurrency(),
        )
    return ds.map_batches(
        make_join_fn(ref, predicate, keep_cols),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=JOIN_BATCH,
    )


def tiles_dataset(sf_dir: str, predicate: str = "covers", layer: Layer | None = None,
                  ds=None):
    """Join pairs + per-polygon 4×4 tile assignment (lazy Dataset)."""
    layer = layer or load_layer(sf_dir)
    pairs = pairs_dataset(sf_dir, predicate, layer, ds=ds)
    return pairs.map_batches(
        make_tile_assign(layer), batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )


def tile_counts(sf_dir: str, salted: bool = False):
    """Rows per (poly_id, tile_id) — the tiling aggregate, combiner-first
    (optionally salted for hot cells)."""
    tiles = tiles_dataset(sf_dir).select_columns(["poly_id", "tile_id"])
    fn = shuffle.salted_grouped_count if salted else shuffle.grouped_count
    return fn(tiles, ["poly_id", "tile_id"], out_col="n_images")


def dwithin_dataset(sf_dir: str, distance: float, layer: Layer | None = None):
    import ray

    from engine.rayds.stages import make_dwithin_fn

    layer = layer or load_layer(sf_dir)
    ref = ray.put(layer)
    return image_dataset(sf_dir).map_batches(
        make_dwithin_fn(ref, distance),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=JOIN_BATCH,
    )


def knn_centers_dataset(sf_dir: str, layer: Layer | None = None,
                        use_actors: bool = False):
    import ray

    from engine.rayds.bcast import cached

    layer = layer or load_layer(sf_dir)
    ref = ray.put(layer)
    if use_actors:
        return image_dataset(sf_dir).map_batches(
            NearestCenterStage,
            fn_constructor_kwargs={"layer_ref": ref},
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=JOIN_BATCH,
            concurrency=_join_concurrency(),
        )

    # default: task pool with per-worker cached centre matrix (same
    # prepared-state semantics as the join's task form, no spawn cost)
    def knn_fn(batch):
        return cached(ref, NearestCenterStage)(batch)

    return image_dataset(sf_dir).map_batches(
        knn_fn, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=JOIN_BATCH,
    )


def encoded_dataset(sf_dir: str):
    """Image table + cell-id columns (the batched encode stage)."""
    return image_dataset(sf_dir).map_batches(
        cell_encode, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )


def run_tiles_checkpointed(sf_dir: str, out_dir: str, num_shards: int = 4) -> dict:
    """Resumable flagship run: shard the events input, write partitioned
    tile-pair parquet + per-shard lineage manifests (ckpt.py)."""
    import ray.data

    layer = load_layer(sf_dir)

    def build(paths):
        import ray

        ds = ray.data.read_parquet(paths, columns=["event_id", "event_type"])
        from engine.rayds.imagetab import derive_batch

        imgs = ds.map_batches(derive_batch, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
        return tiles_dataset(sf_dir, layer=layer, ds=imgs)

    return ckpt.run_sharded(build, [f"{sf_dir}/events.parquet"], out_dir,
                            num_shards=num_shards)


def run_tiles_checkpointed_ranges(sf_dir: str, out_dir: str,
                                  num_shards: int = 4) -> dict:
    """Resumable flagship run over KEY-RANGE shards (event_id mod N) —
    the single-input-file form of per-partition lineage; each shard is
    an independently recomputable, manifest-tracked slice."""
    import pyarrow as pa_mod
    import ray.data

    from engine.rayds.imagetab import derive_batch

    layer = load_layer(sf_dir)

    def build(shard_idx: int, n: int):
        ds = ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_id", "event_type"]
        )

        def pick(batch: pa_mod.Table) -> pa_mod.Table:
            eid = batch["event_id"].to_numpy()
            return batch.filter(pa_mod.array(eid % n == shard_idx))

        imgs = ds.map_batches(pick, batch_format="pyarrow", batch_size=None).map_batches(
            derive_batch, batch_format="pyarrow", batch_size=None
        )
        return tiles_dataset(sf_dir, layer=layer, ds=imgs)

    return ckpt.run_sharded_ranges(build, [f"{sf_dir}/events.parquet"], out_dir,
                                   num_shards=num_shards)


def run_celljoin_checkpointed(sf_dir: str, out_dir: str,
                              num_shards: int = 4,
                              predicate: str = "covers") -> dict:
    """Resumable BIG-BIG cell join (the ``join_covers_cellpart`` plan)
    over KEY-RANGE shards: the point side is sliced by
    ``event_id % num_shards``; the polygon side (layer covers) rides into
    every shard.  Correct per shard because only the point side is
    sliced — every (point, polygon) pair forms in exactly one shard, so
    the shard outputs partition the unsharded join's output.  A failed
    run recomputes only shards without a valid manifest."""
    import ray.data

    from engine.rayds.celljoin import cellpart_pairs
    from engine.rayds.imagetab import derive_batch

    layer = load_layer(sf_dir)

    def build(shard_idx: int, n: int):
        ds = ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_id", "event_type"]
        )

        def pick(batch: pa.Table) -> pa.Table:
            eid = batch["event_id"].to_numpy()
            return batch.filter(pa.array(eid % n == shard_idx))

        imgs = ds.map_batches(pick, batch_format="pyarrow", batch_size=None).map_batches(
            derive_batch, batch_format="pyarrow", batch_size=None
        )
        return cellpart_pairs(sf_dir, layer=layer, predicate=predicate, ds=imgs)

    return ckpt.run_sharded_ranges(build, [f"{sf_dir}/events.parquet"], out_dir,
                                   num_shards=num_shards)


def run_keyedjoin_checkpointed(sf_dir: str, out_dir: str,
                               num_shards: int = 4,
                               plan: str = "s2",
                               predicate: str = "covers") -> dict:
    """Resumable S2-/hex-KEYED big-big join (the ``join_covers_s2part`` /
    ``join_covers_hexpart`` plans) over KEY-RANGE shards, matching
    ``run_celljoin_checkpointed``: the point side is sliced by
    ``event_id % num_shards``; the polygon side (a lazy poly-row
    Dataset) rides into every shard.  Correct per shard because only the
    point side is sliced and both keyings emit each (point, polygon)
    pair at most once — the shard outputs partition the unsharded
    join's output.  A failed run recomputes only shards without a valid
    manifest."""
    import ray.data

    from engine.rayds.celljoin import hexpart_pairs, s2part_pairs
    from engine.rayds.imagetab import derive_batch, layer_dataset

    pairs_fn = {"s2": s2part_pairs, "hex": hexpart_pairs}[plan]

    def build(shard_idx: int, n: int):
        ds = ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_id", "event_type"]
        )

        def pick(batch: pa.Table) -> pa.Table:
            eid = batch["event_id"].to_numpy()
            return batch.filter(pa.array(eid % n == shard_idx))

        imgs = ds.map_batches(pick, batch_format="pyarrow", batch_size=None).map_batches(
            derive_batch, batch_format="pyarrow", batch_size=None
        )
        return pairs_fn(sf_dir, predicate=predicate, ds=imgs,
                        layer_ds=layer_dataset(sf_dir))

    return ckpt.run_sharded_ranges(build, [f"{sf_dir}/events.parquet"], out_dir,
                                   num_shards=num_shards)


def run_dedup_checkpointed(sf_dir: str, out_dir: str,
                           num_shards: int = 4) -> dict:
    """Resumable EXACT DEDUP (the ``dedup_exact`` plan) over KEY-HASH
    shards: shard i owns keys with ``hash(key16) % num_shards == i`` —
    the same hash partitioning the dedup's shuffle uses, so each shard's
    per-key (min doc_id, copy count) is globally complete for its keys
    and cross-shard duplicates are impossible by construction.  (Each
    shard re-scans the input with an early per-block filter + combiner;
    at 100 TB the scan is the cheap part relative to re-running the
    whole dedup on failure, and shards recompute independently.)"""
    import pyarrow.compute as pc
    import ray.data

    from engine.rayds.shuffle import _col_hash, hash_shuffle_agg

    def build(shard_idx: int, n: int):
        docs = ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )

        def partial(batch: pa.Table) -> pa.Table:
            key = pc.utf8_slice_codeunits(batch["text"], 0, 16)
            t = pa.table({"key16": key, "doc_id": batch["doc_id"]})
            h = _col_hash(t["key16"])
            t = t.filter(pa.array((h % np.uint64(n)).view(np.int64) == shard_idx))
            g = t.group_by(["key16"]).aggregate(
                [("doc_id", "min"), ("doc_id", "count")]
            )
            return g.rename_columns(["key16", "_min_id", "_cnt"])

        part = docs.map_batches(
            partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
        )
        return hash_shuffle_agg(
            part, ["key16"], [("_min_id", "min"), ("_cnt", "sum")],
            ["doc_id", "n_copies"],
        )

    return ckpt.run_sharded_ranges(build, [f"{sf_dir}/documents.parquet"], out_dir,
                                   num_shards=num_shards)


def semi_anti_ids(sf_dir: str, anti: bool = False):
    """Images with ≥1 polygon match (semi) / no match (anti) — projection
    of the inner join per SURVEY.md §2.4, fully distributed:

    - semi: distinct matched ids via the hash-shuffle ``grouped_count``
      (a join output's distinct-id cardinality grows with the input, so
      the plan is statically known — no sampling probe, no tree-reduce
      single-block funnel).
    - anti: the matched-id set is assembled WITHOUT any all-to-all —
      per-block DISTINCT partials (combiner) stream to the driver and
      fold through incremental ``pc.unique`` compaction; driver volume
      is bounded at a small multiple of the broadcast budget (the fold
      aborts to the cogroup fallback the moment the running unique
      count overflows, before pulling more).  Within budget the id set
      ships once via ``ray.put`` and every image block filters locally
      with Arrow's hashed ``is_in`` — the join scan is the only pass
      over big data.  Past the budget, the exact fallback is the
      hash-partitioned COGROUP: per-block match-count partials unioned
      with the tagged full id column, one ``groupby(image_id).sum``
      exchange, keep ids whose match count is zero.  Either way the
      result is exact and nothing unbounded lands on the driver.
    """
    import pyarrow.compute as pc

    pairs = pairs_dataset(sf_dir).select_columns(["image_id"])
    if not anti:
        return shuffle.grouped_count(
            pairs, ["image_id"], out_col="n_matches", use_shuffle=True
        ).select_columns(["image_id"])

    def block_distinct(batch: pa.Table) -> pa.Table:
        return batch.select(["image_id"]).group_by(["image_id"]).aggregate([])

    partial = pairs.map_batches(
        block_distinct, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True,
    )
    acc: list = []
    acc_len = 0
    overflow = False
    for b in partial.iter_batches(batch_format="pyarrow"):
        arr = b["image_id"]
        acc.append(arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr)
        acc_len += len(b)
        if acc_len > 2 * ANTI_BROADCAST_MAX_IDS:
            u = pc.unique(pa.chunked_array(acc))
            if isinstance(u, pa.ChunkedArray):
                u = u.combine_chunks()
            acc, acc_len = [u], len(u)
            if acc_len > ANTI_BROADCAST_MAX_IDS:
                overflow = True
                break
    if not overflow:
        vs = pc.unique(pa.chunked_array(acc)) if acc else pa.array([], type=pa.string())
        if isinstance(vs, pa.ChunkedArray):
            vs = vs.combine_chunks()
        overflow = len(vs) > ANTI_BROADCAST_MAX_IDS
    if not overflow:
        import ray

        vs_ref = ray.put(vs)

        def filter_unmatched(batch: pa.Table) -> pa.Table:
            val = _resolve(vs_ref)
            return batch.filter(
                pc.invert(pc.is_in(batch["image_id"], value_set=val))
            )

        return image_dataset(sf_dir).select_columns(["image_id"]).map_batches(
            filter_unmatched, batch_format="pyarrow", batch_size=None,
            zero_copy_batch=True,
        )

    def tag_zero(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "image_id": batch["image_id"],
                "_m": pa.array(np.zeros(len(batch), dtype=np.int64)),
            }
        )

    def match_partial(batch: pa.Table) -> pa.Table:
        t = batch.group_by(["image_id"]).aggregate([([], "count_all")])
        return t.rename_columns(["image_id", "_m"])

    imgs = image_dataset(sf_dir).select_columns(["image_id"]).map_batches(
        tag_zero, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
    matched = pairs.map_batches(
        match_partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
    cog = shuffle.hash_shuffle_agg(
        imgs.union(matched), ["image_id"], [("_m", "sum")], ["_m"]
    )

    def keep_unmatched(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.equal(batch["_m"], 0)).select(["image_id"])

    return cog.map_batches(keep_unmatched, batch_format="pyarrow", batch_size=None)


def run_curation_checkpointed(sf_dir: str, out_dir: str,
                              num_shards: int = 4) -> dict:
    """Resumable LLM-CURATION chain (the ``curation_pipeline`` plan:
    language filter → integer quality gates → exact dedup keeping the
    lowest doc_id) over FP-HASH shards: the row-local filters run
    before sharding, shard i owns md5-fingerprints with
    ``hash(fp) % num_shards == i`` — the same partitioning the dedup
    exchange uses, so each shard's keep-lowest set is globally
    complete for its keys and cross-shard duplicates are impossible by
    construction.  Shards recompute independently under ckpt
    manifests (lineage = input files + slice)."""
    import pyarrow.compute as pc
    import ray.data

    from engine.ops import text
    from engine.ops.vhash import md5_hex
    from engine.rayds.shuffle import _col_hash, hash_shuffle_agg

    def build(shard_idx: int, n: int):
        docs = ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

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
            h = _col_hash(g["fp"])
            g = g.filter(pa.array(
                (h % np.uint64(n)).view(np.int64) == shard_idx))
            agg = g.group_by(["fp"]).aggregate(
                [("doc_id", "min"), ("n_tokens", "min")])
            return agg.rename_columns(["fp", "_min_id", "_nt"])

        part = docs.map_batches(gate, batch_format="pyarrow",
                                batch_size=None, zero_copy_batch=True)
        return hash_shuffle_agg(part, ["fp"],
                                [("_min_id", "min"), ("_nt", "min")],
                                ["doc_id", "n_tokens"])

    return ckpt.run_sharded_ranges(build,
                                   [f"{sf_dir}/documents.parquet"],
                                   out_dir, num_shards=num_shards)


def run_curation_full(sf_dir: str, out_dir: str, num_shards: int = 4,
                      near_threshold: float = 0.5) -> dict:
    """The FULL LLM-curation story as one resumable job:

      phase1/  lang-ID → quality gates → exact dedup (keep lowest id)
               — per-key-hash-shard manifests (run_curation_checkpointed)
      phase2/  near-dup pruning over the survivors: md5-LSH candidates
               verified with exact window Jaccard ≥ ``near_threshold``;
               the LARGER doc of every verified pair is dropped
               (deterministic greedy policy — for duplicate chains this
               keeps exactly the min id, the exact-dedup convention)
      phase3/  benchmark decontamination: drop survivors sharing any
               word-5-gram with the benchmark slice (source='src0')

    Each phase checkpoints independently; phase k's manifest fingerprint
    chains phase k-1's manifest FILES, so a re-run resumes at the first
    phase whose manifests are missing or whose upstream changed, and a
    phase-1 recompute automatically invalidates phases 2-3.  Returns
    per-phase row metrics."""
    import pyarrow.compute as pc
    import ray
    import ray.data

    from engine.ops import dedup as D

    out1 = os.path.join(out_dir, "phase1")
    out2 = os.path.join(out_dir, "phase2")
    out3 = os.path.join(out_dir, "phase3")
    r1 = run_curation_checkpointed(sf_dir, out1, num_shards=num_shards)
    m1 = [ckpt.manifest_path(out1, i) for i in range(num_shards)]
    docs_path = f"{sf_dir}/documents.parquet"

    def _survivor_ids(dirs) -> "np.ndarray":
        files = [os.path.join(d, f) for d in dirs
                 for f in sorted(os.listdir(d)) if f.endswith(".parquet")]
        surv = ray.data.read_parquet(files, columns=["doc_id"])
        ids: list = []
        total = 0
        for b in surv.iter_batches(batch_format="pyarrow"):
            ids.append(b["doc_id"].to_numpy())
            total += len(b)
            if total > 20_000_000:
                raise RuntimeError(
                    "survivor id set exceeds the broadcast budget; switch "
                    "the near-dup phase to the hash semi-join plan")
        return np.sort(np.concatenate(ids)) if ids else np.empty(0, np.int64)

    def _docs_subset(keep_sorted):
        ref = ray.put(keep_sorted)

        def pick(batch: pa.Table) -> pa.Table:
            from engine.rayds.bcast import cached

            k = cached(ref)
            did = batch["doc_id"].to_numpy()
            pos = np.searchsorted(k, did)
            pos = np.clip(pos, 0, max(len(k) - 1, 0))
            hit = (k[pos] == did) if len(k) else np.zeros(len(did), bool)
            return batch.filter(pa.array(hit))

        return ray.data.read_parquet(
            docs_path, columns=["doc_id", "text", "source"]
        ).map_batches(pick, batch_format="pyarrow", batch_size=None,
                      zero_copy_batch=True)

    def build2(_i: int, _n: int):
        keep = _survivor_ids([f"{out1}/shard={i}" for i in range(num_shards)])
        docs = _docs_subset(keep).select_columns(["doc_id", "text"])
        pairs = D.minhash_verified_pairs_md5(docs, threshold=near_threshold)
        drop_parts = [b["b"].to_numpy()
                      for b in pairs.iter_batches(batch_format="pyarrow")]
        drop = np.unique(np.concatenate(drop_parts)) if drop_parts else \
            np.empty(0, np.int64)
        kept = keep[~np.isin(keep, drop)]
        return ray.data.from_arrow(pa.table({"doc_id": pa.array(kept)}))

    r2 = ckpt.run_sharded_ranges(build2, m1 + [docs_path], out2, num_shards=1)

    def build3(_i: int, _n: int):
        from engine.ops.contam import benchmark_ngram_set, contamination_screen

        keep = _survivor_ids([f"{out2}/shard=0"])
        all_docs = ray.data.read_parquet(
            docs_path, columns=["doc_id", "text", "source"])
        bench = all_docs.map_batches(
            lambda b: b.filter(pc.equal(b["source"], "src0")),
            batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
        gref = ray.put(benchmark_ngram_set(bench))
        corpus = _docs_subset(keep)
        hits = contamination_screen(corpus, gref)
        bad_parts = [b["doc_id"].to_numpy()
                     for b in hits.iter_batches(batch_format="pyarrow")]
        bad = np.unique(np.concatenate(bad_parts)) if bad_parts else \
            np.empty(0, np.int64)
        kept = keep[~np.isin(keep, bad)]
        return ray.data.from_arrow(pa.table({"doc_id": pa.array(kept)}))

    m2 = [ckpt.manifest_path(out2, 0)]
    r3 = ckpt.run_sharded_ranges(build3, m2 + [docs_path], out3, num_shards=1)

    def _rows(out, shards):
        import json as _json

        t = 0
        for i in range(shards):
            with open(ckpt.manifest_path(out, i)) as f:
                t += _json.load(f)["rows"]
        return t

    return {
        "phase1": r1, "phase2": r2, "phase3": r3,
        "rows_after_phase1": _rows(out1, num_shards),
        "rows_after_phase2": _rows(out2, 1),
        "rows_after_phase3": _rows(out3, 1),
    }
