"""Shuffle helpers: partial (combiner) aggregation + salted hot-key splits.

Ray Data's ``groupby`` hash-shuffles every block; at 10^12 rows the only
viable aggregate is partial-per-block first (the classic combiner), and
skewed keys need salting (north_rule: "skewed hot cells split via salted
groupby-aggregate shuffles").  Both helpers keep the wide exchange down
to the already-reduced partials.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _partial_count_fn(keys: list[str]):
    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0:
            # Ray 2.49 drops the schema of zero-row map outputs — pass
            # the column-less anchor through (merge plans drop these)
            return batch
        t = batch.select(keys).group_by(keys).aggregate([([], "count_all")])
        return t.rename_columns(keys + ["_pcnt"])

    return partial


def _merge_counts(keys: list[str]):
    def merge(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0:
            return batch
        t = batch.group_by(keys).aggregate([("_pcnt", "sum")])
        return t.rename_columns(keys + ["_pcnt"])

    return merge


def _col_hash(col) -> np.ndarray:
    """Vectorized uint64 hash of an Arrow column (int-like or string) —
    the deterministic partition key for the engine's own hash shuffle."""
    arr = col
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    t = arr.type
    if pa.types.is_string(t) or pa.types.is_binary(t) or pa.types.is_large_string(t):
        n = len(arr)
        bo = arr.offset
        width = np.int64 if pa.types.is_large_string(t) else np.int32
        voff = np.frombuffer(arr.buffers()[1], dtype=width)[bo : bo + n + 1].astype(
            np.int64
        )
        lens = voff[1:] - voff[:-1]
        h = np.zeros(n, dtype=np.uint64)
        total = int(lens.sum())
        if total:
            data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
            starts = np.repeat(voff[:-1], lens)
            cum = np.cumsum(lens) - lens
            within = np.arange(total, dtype=np.int64) - np.repeat(cum, lens)
            b = data[starts + within].astype(np.uint64)
            powers = np.ones(int(lens.max()), dtype=np.uint64)
            if len(powers) > 1:
                powers[1:] = np.cumprod(
                    np.full(len(powers) - 1, np.uint64(1099511628211), dtype=np.uint64)
                )
            terms = (b + np.uint64(0x101)) * powers[
                np.repeat(lens, lens) - 1 - within
            ]
            nz = lens > 0
            h[nz] = np.add.reduceat(terms, cum[nz])
    else:
        h = arr.to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64).copy()
    h ^= h >> np.uint64(33)
    h *= np.uint64(0xFF51AFD7ED558CCD)
    h ^= h >> np.uint64(29)
    return h


HASH_PARTS = 64  # partitions of the engine's own hash-shuffle aggregate


def add_hash_part(keys: list[str], num_parts: int = HASH_PARTS):
    """Stage: + _part column = hash(keys) % num_parts."""

    def fn(batch: pa.Table) -> pa.Table:
        h = np.zeros(len(batch), dtype=np.uint64)
        for k in keys:
            h = h * np.uint64(0x100000001B3) + _col_hash(batch[k])
        return batch.append_column(
            "_part", pa.array((h % np.uint64(num_parts)).view(np.int64))
        )

    return fn


def task_hash_exchange(ds, keys: list[str], apply_fn,
                       num_parts: int = HASH_PARTS):
    """The engine's raw-task BSP hash exchange: materialize ``ds``,
    SPLIT each block into ``num_parts`` hash partitions (one
    ``num_returns=P`` task per block — stable argsort + zero-copy
    slices), then REDUCE partition ``p`` by concatenating its B slices
    and applying ``apply_fn(table) → table``.  Returns the reduced
    partitions as a ``from_arrow_refs`` Dataset (reduce outputs never
    touch the driver).

    Why not ``groupby("_part").map_groups``: Ray Data's sort-based
    all-to-all pays a global sort plus a multi-second fixed barrier —
    measured 3–4× slower at bench shapes with identical asymptotics
    (both move B×P objects).  Reduce fan-in is two-level past 512
    blocks so no task ever takes an unbounded argument list.

    The partition hash is EXACTLY ``add_hash_part``'s (FNV-1a fold over
    ``_col_hash`` of each key), so plans are interchangeable."""
    import ray
    import ray.data

    @ray.remote(num_returns=num_parts)
    def split(tbl: pa.Table):
        if tbl.num_columns == 0 or tbl.num_rows == 0:
            # schema-less empty block (Ray 2.49 drops the schema of
            # all-empty upstreams) — emit it everywhere; the reduce
            # filter drops column-less tables, and a zero-row WITH-
            # schema table still anchors the output schema.
            out = tuple(tbl.slice(0, 0) for _ in range(num_parts))
            return out if num_parts > 1 else out[0]
        h = np.zeros(tbl.num_rows, dtype=np.uint64)
        for k in keys:
            h = h * np.uint64(0x100000001B3) + _col_hash(tbl[k])
        h = (h % np.uint64(num_parts)).view(np.int64)
        ix = np.argsort(h, kind="stable")
        hs = h[ix]
        bounds = np.searchsorted(hs, np.arange(num_parts + 1))
        s = tbl.take(pa.array(ix))
        out = tuple(s.slice(int(bounds[p]), int(bounds[p + 1] - bounds[p]))
                    for p in range(num_parts))
        return out if num_parts > 1 else out[0]

    def _concat(tbls):
        # blocks from a unioned upstream can agree on names but differ
        # in column ORDER (e.g. hash_equi_join's two tag maps); align to
        # the first block's order before concat (zero-copy select).
        order = tbls[0].column_names
        aligned = [t if t.column_names == order else t.select(order)
                   for t in tbls]
        return pa.concat_tables(aligned).combine_chunks()

    @ray.remote
    def gather(*tbls):
        keep = [t for t in tbls if t.num_columns]
        return _concat(keep) if keep else tbls[0]

    @ray.remote
    def reduce(*tbls):
        keep = [t for t in tbls if t.num_columns]
        if not keep:
            return tbls[0]
        return apply_fn(_concat(keep))

    mat = ds.materialize()
    refs = mat.to_arrow_refs()
    if not refs:
        return mat
    cols = [split.remote(b) for b in refs]
    if num_parts == 1:
        cols = [[c] for c in cols]
    outs = []
    for p in range(num_parts):
        mine = [cols[i][p] for i in range(len(cols))]
        while len(mine) > 512:
            mine = [gather.remote(*mine[i:i + 512])
                    for i in range(0, len(mine), 512)]
        outs.append(reduce.remote(*mine))
    return ray.data.from_arrow_refs(outs)


def hash_exchange_groups(ds, keys: list[str], group_fn,
                         num_parts: int = HASH_PARTS):
    """``task_hash_exchange`` wrapper for the legacy per-partition group
    fns written against ``add_hash_part`` + ``groupby("_part")`` — the
    fn still sees a ``_part`` column (appended constant; it drops it),
    and each call receives ONE whole hash partition, exactly as before,
    minus the sort-based barrier."""

    def apply(t: pa.Table) -> pa.Table:
        part = pa.array(np.zeros(t.num_rows, dtype=np.int64))
        return group_fn(t.append_column("_part", part))

    return task_hash_exchange(ds, keys, apply, num_parts)


def _seg_codes(col) -> np.ndarray:
    """Order-isomorphic numeric codes for run segmentation (lexsort
    can't take object/string arrays directly on all dtypes)."""
    arr = col.to_numpy(zero_copy_only=False)
    if arr.dtype.kind in "OUS":
        _, codes = np.unique(arr, return_inverse=True)
        return codes
    return arr


def hash_exchange_fine_groups(ds, keys: list[str], group_fn,
                              num_parts: int = HASH_PARTS):
    """``groupby(keys).map_groups`` semantics over the raw-task BSP
    exchange: ONE hash exchange co-locates whole keys; inside each
    partition rows lexsort by the keys and ``group_fn`` runs once per
    distinct key run — exactly the old per-group contract, minus the
    sort-based barrier.  Empty partitions call ``group_fn`` once on a
    zero-row table (schema anchor) — fns must tolerate empty input."""

    def apply(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return group_fn(t)
        cols = [_seg_codes(t[k]) for k in keys]
        order = np.lexsort(tuple(reversed(cols)))
        ts = t.take(pa.array(order))
        cs = [c[order] for c in cols]
        n = len(order)
        new = np.zeros(n, dtype=bool)
        new[0] = True
        for c in cs:
            new[1:] |= c[1:] != c[:-1]
        starts = np.nonzero(new)[0]
        ends = np.append(starts[1:], n)
        outs = [group_fn(ts.slice(s, e - s)) for s, e in zip(starts, ends)]
        keep = [o for o in outs if o.num_rows]
        if not keep:
            return outs[0]
        return pa.concat_tables(keep).combine_chunks()

    return task_hash_exchange(ds, keys, apply, num_parts)


def hash_shuffle_agg(partial_ds, keys: list[str], merge_spec: list[tuple[str, str]],
                     out_cols: list[str], num_parts: int = HASH_PARTS):
    """The engine's hash-shuffle aggregate: partition the (already
    combiner-reduced) partials by key hash, merge each partition with a
    vectorized pyarrow ``group_by`` inside ``map_groups``.

    This deliberately avoids Ray's ``groupby().sum/min`` Aggregate
    operator (~20 s fixed actor-pool overhead per call in Ray 2.49 even
    on 10^5 rows) AND the sort-based ``groupby("_part").map_groups``
    exchange (global sort + multi-second fixed barrier) — the raw-task
    BSP exchange is another 3–4× cheaper at bench shapes with identical
    asymptotics (per-partition merge, no single-block funnel)."""

    def merge(group: pa.Table) -> pa.Table:
        t = group.group_by(keys).aggregate(merge_spec)
        return t.rename_columns(keys + out_cols)

    return task_hash_exchange(partial_ds, keys, merge, num_parts)


_PARTIAL_MERGE_FN = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}


def grouped_agg(ds, keys: list[str], specs: list[tuple[str, str]],
                out_cols: list[str], plan: str = "shuffle",
                num_parts: int = HASH_PARTS,
                empty_schema: pa.Schema | None = None):
    """Combiner-first grouped aggregate for DECOMPOSABLE aggregations
    (sum / count / min / max — partials re-aggregate associatively).

    Stage 1 (always): per-block ``pyarrow.group_by`` partial — downstream
    moves ≤ (distinct keys × blocks) rows instead of every input row.
    Stage 2: ``plan="tree"`` → raw-task tree fold of the partial blocks
    into ONE final table, returned as a single-block ``from_arrow``
    Dataset (right when distinct keys ≪ rows, e.g. a 5-region rollup —
    NO all-to-all, no Repartition barrier; downstream single-block maps
    may rely on seeing every row); ``plan="shuffle"`` → the engine's
    hash exchange over the partials (group cardinality too large for
    one block).  Callers that already produced partials use
    ``hash_shuffle_agg`` / ``merge_partial_counts`` directly."""
    pcols = [f"_p{i}" for i in range(len(specs))]
    merge_spec = [(p, _PARTIAL_MERGE_FN[fn]) for p, (_, fn) in zip(pcols, specs)]

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0:
            # column-less empty anchor (a task-exchange partition that
            # saw no rows) — pass through; both merge plans drop these
            return batch
        g = batch.group_by(keys).aggregate([(c, fn) for c, fn in specs])
        return g.rename_columns(keys + pcols)

    part = ds.map_batches(partial, batch_format="pyarrow", batch_size=None,
                          zero_copy_batch=True)
    if plan == "shuffle":
        return hash_shuffle_agg(part, keys, merge_spec, out_cols, num_parts)

    def combine(tbls: list[pa.Table]) -> pa.Table:
        t = pa.concat_tables(tbls).combine_chunks()
        g = t.group_by(keys).aggregate(merge_spec)
        return g.rename_columns(keys + pcols)

    import ray.data

    final = tree_fold_refs(part, combine)
    if final.num_columns == 0 and empty_schema is not None:
        # an ALL-EMPTY input: Ray 2.49 drops the schema of zero-row map
        # outputs, so the fold has nothing typed to anchor on — callers
        # whose input may be legitimately empty pass the output schema
        return ray.data.from_arrow(empty_schema.empty_table())
    return ray.data.from_arrow(final.rename_columns(keys + out_cols))


def tree_fold_refs(ds, combine, width: int = 64) -> pa.Table:
    """Materialize ``ds`` and fold its Arrow block refs through raw Ray
    task waves — ``combine(list[pa.Table]) → pa.Table`` runs width-way
    per level until one table remains (returned driver-side).

    Why raw tasks: Ray Data's ``Repartition`` operator carries a
    multi-second FIXED barrier latency regardless of data size (measured
    ~2.6 s each in Ray 2.49), so a 16→1 fan-in over kilobyte partials
    paid ~5 s; a task wave costs milliseconds (same finding as the CC
    BSP and k-means Lloyd rounds).  Only for BOUNDED partials — the
    caller guarantees the folded result fits one block by contract
    (grouped_agg tree plan, skyline frontier, top-k merges)."""
    import ray

    def _step(tbls):
        # upstream map stages may emit SCHEMA-LESS empties for zero-row
        # blocks (pa.table({}) has no columns) — drop them before concat
        keep = [t for t in tbls if t.num_columns]
        return combine(keep) if keep else tbls[0]

    @ray.remote
    def step(*tbls):
        return _step(list(tbls))

    mat = ds.materialize()
    refs = mat.to_arrow_refs()
    if not refs:
        sch = mat.schema(fetch_if_missing=True)
        if sch is None:
            return pa.table({})  # schema-less empty: callers check num_columns
        return combine([sch.base_schema.empty_table()])
    while len(refs) > 1:
        refs = [step.remote(*refs[i:i + width])
                for i in range(0, len(refs), width)]
    return _step([ray.get(refs[0])])


def choose_count_plan(ds, keys: list[str], sample: int = 8192,
                      ratio_threshold: float = 0.25) -> bool:
    """Sampled plan choice for grouped_count: True → hash-shuffle.

    Probes the first ``sample`` rows (a streaming ``limit`` — executes
    only the pipeline prefix) and switches to the hash-shuffle plan when
    the distinct-key ratio says the final tree-reduce block would have
    to hold a cardinality that grows with the input (e.g. words, ids)."""
    try:
        t = ds.limit(sample).take_batch(sample, batch_format="pyarrow")
    except Exception:
        return False
    if t.num_rows == 0:
        return False
    distinct = t.select(keys).group_by(keys).aggregate([]).num_rows
    return distinct / t.num_rows > ratio_threshold


def grouped_count(ds, keys: list[str], out_col: str = "cnt",
                  use_shuffle=False):
    """count(*) per key, combiner-first.

    Stage 1 (narrow): per-block ``pyarrow`` group_by → partial counts —
    downstream stages then move ≤ (distinct keys × blocks) rows instead
    of every input row.

    Stage 2 default = TREE REDUCE (coalesce → combine → single final
    combine): right whenever distinct keys ≪ rows, and avoids the
    sort-based all-to-all entirely.  ``use_shuffle=True`` switches to the
    hash-shuffle ``groupby`` — the path for group cardinalities too large
    for one final block (then the exchange only moves partials).
    ``use_shuffle="auto"`` probes a sample (``choose_count_plan``) and
    picks the plan from the observed distinct-key ratio.
    """
    if use_shuffle == "auto":
        use_shuffle = choose_count_plan(ds, keys)
    partial = ds.map_batches(
        _partial_count_fn(keys), batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
    if use_shuffle:
        merged = hash_shuffle_agg(partial, keys, [("_pcnt", "sum")], ["_pcnt"])

        def rename(batch: pa.Table) -> pa.Table:
            return batch.rename_columns(keys + [out_col])

        return merged.map_batches(rename, batch_format="pyarrow", batch_size=None)

    return merge_partial_counts(partial, keys, out_col)


def merge_partial_counts(partial_ds, keys: list[str], out_col: str = "cnt",
                         two_level: bool = False):
    """Reduce (keys…, _pcnt) partial blocks to final counts via the
    raw-task tree fold (64-way waves; no Repartition barrier).  The
    combiner already shrank each block to its group cardinality, so the
    folded result fits one block by the caller's contract.
    ``two_level`` is kept for API compatibility (the fold is always
    multi-level when the block count warrants it)."""
    import ray.data

    mfn = _merge_counts(keys)

    def combine(tbls: list[pa.Table]) -> pa.Table:
        return mfn(pa.concat_tables(tbls).combine_chunks())

    final = tree_fold_refs(partial_ds, combine)
    if final.num_columns == 0:
        # every partial was a schema-less zero-row anchor (Ray 2.49
        # drops empty map-output schemas): emit a typed empty result —
        # int64 keys cover the engine's count callers; callers with
        # other key types see zero rows either way
        return ray.data.from_arrow(pa.table(
            {c: pa.array([], type=pa.int64()) for c in keys + [out_col]}))
    return ray.data.from_arrow(final.rename_columns(keys + [out_col]))


def salted_grouped_count(ds, keys: list[str], out_col: str = "cnt", salt: int = 16):
    """Two-round salted count for skewed keys.

    Round 1 groups on (keys…, _salt) — a hot key's rows land on ``salt``
    different reducers instead of one straggler; round 2 merges the per-
    salt partials with a tiny second shuffle.  The salt is derived from a
    per-batch row counter (deterministic, no RNG in workers).
    """

    def add_salt(batch: pa.Table) -> pa.Table:
        t = batch.select(keys)
        s = np.arange(len(batch), dtype=np.int64) % salt
        t = t.append_column("_salt", pa.array(s))
        t = t.group_by(keys + ["_salt"]).aggregate([([], "count_all")])
        return t.rename_columns(keys + ["_salt", "_pcnt"])

    partial = ds.map_batches(add_salt, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    round1 = hash_shuffle_agg(partial, keys + ["_salt"], [("_pcnt", "sum")], ["_pcnt"])

    def strip(batch: pa.Table) -> pa.Table:
        return batch.select(keys + ["_pcnt"])

    round2 = hash_shuffle_agg(
        round1.map_batches(strip, batch_format="pyarrow", batch_size=None),
        keys, [("_pcnt", "sum")], ["_pcnt"],
    )

    def rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(keys + [out_col])

    return round2.map_batches(rename, batch_format="pyarrow", batch_size=None)


def dataset_minmax(ds, cols: list[str]) -> dict[str, tuple[float, float]]:
    """Global (min, max) per column — combiner-first: one tiny partial
    row per block, final combine over ≤blocks rows (Ray's built-in
    global Aggregate pays the same ~fixed actor-pool cost as its
    groupby; this is one narrow map + a bounded take)."""

    def partial(batch: pa.Table) -> pa.Table:
        out = {}
        for c in cols:
            v = batch[c].to_numpy(zero_copy_only=False)
            out[f"{c}_min"] = [float(np.min(v))] if len(v) else [np.inf]
            out[f"{c}_max"] = [float(np.max(v))] if len(v) else [-np.inf]
        return pa.table(out)

    rows = ds.select_columns(cols).map_batches(
        partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).take_all()
    res = {}
    for c in cols:
        res[c] = (
            min(r[f"{c}_min"] for r in rows),
            max(r[f"{c}_max"] for r in rows),
        )
    return res


def detect_hot_keys(ds, key: str, threshold_frac: float = 0.05, sample_blocks: int = 4):
    """Cheap skew probe: counts on a block sample; returns hot key values.

    At scale this runs on a ``ds.limit(...)`` sample, never the full
    input; callers switch the downstream groupby to the salted variant
    for the returned keys (or for everything when any key exceeds the
    threshold).
    """
    sample = ds.limit(100_000)
    rows = grouped_count(sample, [key]).take_all()
    total = sum(r["cnt"] for r in rows)
    if total == 0:
        return []
    return [r[key] for r in rows if r["cnt"] > threshold_frac * total]


def sessionize(ds, key: str, ts_col: str, gap_us: int,
               sum_col: str | None = None, num_parts: int = HASH_PARTS,
               out_col: str | None = None):
    """SESSION-WINDOW aggregate: per ``key``, events ordered by ``ts_col``
    split into sessions wherever the gap to the previous event exceeds
    ``gap_us``; one output row per (key, session) with the session start,
    event count and (optionally) an int64 sum of ``sum_col``.

    Scale shape: ONE hash exchange on the key (same partitioned-cogroup
    primitive as the LSH stages); inside each partition the whole
    sessionization is vectorized — lexsort by (key, ts), gap diff,
    boundary cumsum for session ids, ``np.add.reduceat`` segment
    aggregates.  Session state never crosses partitions because a key
    lives in exactly one partition; no per-key Python loop anywhere.

    Skew assumption (shared with every per-key windowed operator): ONE
    key's events must fit a partition.  For hot keys that don't, use
    ``sessionize_split`` — time-range pre-split with boundary
    stitching (detect candidates with ``detect_hot_keys``).
    """
    cols = [key, ts_col] + ([sum_col] if sum_col else [])
    out_col = out_col or (f"sum_{sum_col}" if sum_col else None)

    def part_fn(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_part"])
        k = g[key].to_numpy()
        ts = g[ts_col].to_numpy()
        order = np.lexsort((ts, k))
        k, ts = k[order], ts[order]
        n = len(k)
        if n == 0:
            out = {key: k, "session_start_us": ts,
                   "n_events": np.empty(0, dtype=np.int64)}
            if sum_col:
                out[out_col] = np.empty(0, dtype=np.int64)
            return pa.table(out)
        new_s = np.ones(n, dtype=bool)
        same_key = k[1:] == k[:-1]
        new_s[1:] = ~same_key | ((ts[1:] - ts[:-1]) > gap_us)
        starts = np.nonzero(new_s)[0]
        counts = np.diff(np.append(starts, n))
        out = {
            key: k[starts],
            "session_start_us": ts[starts],
            "n_events": counts.astype(np.int64),
        }
        if sum_col:
            v = g[sum_col].to_numpy()[order]
            out[out_col] = np.add.reduceat(v, starts).astype(np.int64)
        return pa.table(out)

    return hash_exchange_groups(ds.select_columns(cols), [key], part_fn,
                                num_parts)


def sessionize_split(ds, key: str, ts_col: str, gap_us: int,
                     sum_col: str | None = None, num_parts: int = HASH_PARTS,
                     bucket_us: int | None = None, out_col: str | None = None):
    """Skew-proof SESSION-WINDOW aggregate: hot-key time-range pre-split.

    ``sessionize`` co-locates ALL events of one key in one partition —
    its documented skew assumption breaks on a 10^9-event key.  This
    variant partitions by ``(key, ts // bucket_us)`` so a hot key's
    events spread over ``time_span / bucket_us`` partitions:

    1. Local sessionization inside each (key, bucket) is exact except
       that sessions are cut at bucket edges.
    2. Only the FIRST and LAST local session of a (key, bucket) can
       merge across an edge — interior sessions are separated from both
       edges by a > gap_us gap — so the stitch exchange carries ≤ 2
       session rows per (key, bucket): bounded by time range, never by
       key volume.
    3. Stitch (keyed by key): merge time-consecutive boundary sessions
       whenever ``next.start − prev.end ≤ gap_us``.  Within-bucket
       neighbors never pass that test by construction, so the blanket
       rule reproduces global sessionization exactly (equivalence-tested
       against brute force and against ``sessionize``).

    The session-level phase-1 output is materialized once (it is the
    aggregated intermediate, orders of magnitude smaller than the event
    input) so interior rows stream straight to the result while boundary
    rows take the tiny stitch exchange.
    """
    cols = [key, ts_col] + ([sum_col] if sum_col else [])
    out_col = out_col or (f"sum_{sum_col}" if sum_col else None)
    bucket_us = bucket_us or gap_us * 4096
    final_cols = [key, "session_start_us", "n_events"] + ([out_col] if sum_col else [])

    def prep(batch: pa.Table) -> pa.Table:
        t = batch.select(cols)
        b = t[ts_col].to_numpy() // np.int64(bucket_us)
        return t.append_column("_bkt", pa.array(b))

    def local_fn(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_part"])
        k = g[key].to_numpy(zero_copy_only=False)
        # _bkt rides the exchange as part of the key; consumed here
        ts = g[ts_col].to_numpy()
        b = g["_bkt"].to_numpy()
        order = np.lexsort((ts, b, k))
        k, ts, b = k[order], ts[order], b[order]
        n = len(k)
        if n == 0:
            out = {key: k, "session_start_us": ts, "_end_us": ts,
                   "n_events": np.empty(0, dtype=np.int64),
                   "_b": np.empty(0, dtype=bool)}
            if sum_col:
                out[out_col] = np.empty(0, dtype=np.int64)
            return pa.table(out)
        new_s = np.ones(n, dtype=bool)
        same = (k[1:] == k[:-1]) & (b[1:] == b[:-1])
        new_s[1:] = ~same | ((ts[1:] - ts[:-1]) > gap_us)
        starts = np.nonzero(new_s)[0]
        ends = np.append(starts[1:], n) - 1
        counts = np.diff(np.append(starts, n)).astype(np.int64)
        kk, bb = k[starts], b[starts]
        first = np.ones(len(starts), dtype=bool)
        first[1:] = (kk[1:] != kk[:-1]) | (bb[1:] != bb[:-1])
        last = np.append(first[1:], True)
        out = {
            key: kk,
            "session_start_us": ts[starts],
            "_end_us": ts[ends],
            "n_events": counts,
            "_b": first | last,
        }
        if sum_col:
            v = g[sum_col].to_numpy()[order]
            out[out_col] = np.add.reduceat(v, starts).astype(np.int64)
        return pa.table(out)

    def pick(boundary: bool):
        def fn(t: pa.Table) -> pa.Table:
            sel = t.filter(pc.equal(t["_b"], boundary))
            return sel.drop_columns(["_b"] + ([] if boundary else ["_end_us"]))
        return fn

    def stitch(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_part"])
        k = g[key].to_numpy(zero_copy_only=False)
        st = g["session_start_us"].to_numpy()
        en = g["_end_us"].to_numpy()
        cnt = g["n_events"].to_numpy()
        order = np.lexsort((st, k))
        k, st, en, cnt = k[order], st[order], en[order], cnt[order]
        n = len(k)
        if n == 0:
            out = {key: k, "session_start_us": st,
                   "n_events": np.empty(0, dtype=np.int64)}
            if sum_col:
                out[out_col] = np.empty(0, dtype=np.int64)
            return pa.table(out)
        new_c = np.ones(n, dtype=bool)
        new_c[1:] = (k[1:] != k[:-1]) | ((st[1:] - en[:-1]) > gap_us)
        cs = np.nonzero(new_c)[0]
        out = {
            key: k[cs],
            "session_start_us": st[cs],
            "n_events": np.add.reduceat(cnt, cs).astype(np.int64),
        }
        if sum_col:
            v = g[out_col].to_numpy()[order]
            out[out_col] = np.add.reduceat(v, cs).astype(np.int64)
        return pa.table(out)

    prepped = ds.map_batches(
        prep, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
    sess = hash_exchange_groups(prepped, [key, "_bkt"], local_fn,
                                num_parts).materialize()
    interior = sess.map_batches(pick(False), batch_format="pyarrow",
                                batch_size=None)
    boundary = sess.map_batches(pick(True), batch_format="pyarrow",
                                batch_size=None)
    stitched = hash_exchange_groups(boundary, [key], stitch, num_parts)
    return interior.select_columns(final_cols).union(
        stitched.select_columns(final_cols)
    )


def hash_equi_join(left, right, left_on: str, right_on: str,
                   left_cols: list[str], right_cols: list[str],
                   num_parts: int = HASH_PARTS, join_type: str = "inner",
                   out_types: dict | None = None):
    """Generic distributed EQUI-JOIN (inner / left outer / right outer /
    full outer — key co-location by hash makes every pyarrow join type
    partition-local): both sides are tagged and
    hash-partitioned on the join key in ONE union exchange; inside each
    partition the two sides are split back out and joined with pyarrow's
    vectorized hash join.  (Manual cogroup instead of ``Dataset.join``
    for the Ray 2.49 empty-first-block schema bug — see
    engine/ops/dedup.py docstring.)

    Key co-location is by hash, so no partition ever needs the other's
    rows; exchange volume is the two projected inputs, once each.
    """
    lcols, rcols = list(left_cols), list(right_cols)
    # resolve output column types once from the input schemas (closure
    # state — serialized with the tag fns, safe under concurrent joins).
    # A side whose schema can't be resolved is EMPTY (Ray 2.49 drops the
    # schema of all-empty-block datasets) — its null columns default to
    # int64 unless the caller pins them via ``out_types`` (pass explicit
    # types when an outer join's empty side holds non-int64 columns and
    # downstream consumers need a stable schema).
    types = dict(out_types or {})
    ls = left.schema(fetch_if_missing=True)
    rs = right.schema(fetch_if_missing=True)
    for c in lcols:
        types.setdefault(
            c, ls.base_schema.field(c).type if ls is not None else pa.int64()
        )
    for c in rcols:
        types.setdefault(
            c, rs.base_schema.field(c).type if rs is not None else pa.int64()
        )

    def tag(side: int, on: str, keep: list[str], other: list[str]):
        def fn(batch: pa.Table) -> pa.Table:
            n = len(batch)
            cols = {"_k": batch[on], "_side": pa.array(np.full(n, side, dtype=np.int8))}
            for c in keep:
                cols[c] = batch[c]
            for c in other:
                cols[c] = pa.nulls(n, type=types[c])
            return pa.table(cols)
        return fn

    lt = left.select_columns([left_on] + lcols).map_batches(
        tag(0, left_on, lcols, rcols), batch_format="pyarrow", batch_size=None
    )
    rt = right.select_columns([right_on] + rcols).map_batches(
        tag(1, right_on, rcols, lcols), batch_format="pyarrow", batch_size=None
    )

    def merge(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_part"])
        side = g["_side"].to_numpy()
        li = np.nonzero(side == 0)[0]
        ri = np.nonzero(side == 1)[0]
        ltab = g.take(pa.array(li)).select(["_k"] + lcols)
        rtab = g.take(pa.array(ri)).select(["_k"] + rcols)
        return ltab.join(rtab, keys=["_k"], join_type=join_type)

    return hash_exchange_groups(lt.union(rt), ["_k"], merge, num_parts)


BROADCAST_JOIN_MAX_ROWS = 1_000_000  # small-side budget for the map-side plan


def broadcast_equi_join(small, large, small_on: str, large_on: str,
                        small_cols: list[str], large_cols: list[str],
                        preserve_large: bool = False,
                        col_order: list[str] | None = None):
    """Map-side EQUI-JOIN: the small side is collected once (bounded by
    the caller's budget), shipped via ``ray.put`` and joined against
    every large-side block inside ``map_batches`` with pyarrow's hash
    join — the large side never shuffles at all.

    ``preserve_large=False`` → inner join.  ``preserve_large=True`` →
    the STREAMED (large) side is outer-preserved: each large row appears
    once, with nulls where the broadcast side has no match — valid
    per-batch because the preserved side is the streamed side (the
    broadcast side can never be outer-preserved map-side: its unmatched
    rows would be re-emitted by every batch).

    ``col_order`` pins the output column order (default: _k +
    small_cols + large_cols) — ``equi_join`` passes the hash plan's
    _k + left + right order so crossing the broadcast budget can never
    silently reorder the output schema."""
    import ray

    if isinstance(small, pa.Table):
        # driver-resident dimension table (``dim_table`` or a caller-
        # built pa.Table): zero Ray executions to collect
        st = small.select([small_on] + small_cols).rename_columns(
            ["_k"] + small_cols)
    else:
        batches = list(
            small.select_columns([small_on] + small_cols)
            .iter_batches(batch_format="pyarrow"))
        if batches:
            st = pa.concat_tables(batches).rename_columns(
                ["_k"] + small_cols)
        else:
            # an EMPTY small side is legitimate (e.g. an exhausted BFS
            # frontier) — build a typed empty from the dataset schema so
            # the per-batch hash join still type-checks
            sch = small.schema(fetch_if_missing=True)
            if sch is not None:
                st = (sch.base_schema.empty_table()
                      .select([small_on] + small_cols)
                      .rename_columns(["_k"] + small_cols))
            else:
                # Ray 2.49 drops even the fetched schema of an all-empty
                # map output: fall back to the documented int64 typing
                st = pa.table({c: pa.array([], type=pa.int64())
                               for c in ["_k"] + small_cols})
    ref = ray.put(st.combine_chunks())
    order = list(col_order) if col_order is not None else (
        ["_k"] + list(small_cols) + list(large_cols)
    )

    def join_fn(batch: pa.Table) -> pa.Table:
        tab = _bcast_table(ref)
        lt = batch.select([large_on] + large_cols).rename_columns(
            ["_k"] + large_cols
        )
        if preserve_large:
            return lt.join(tab, keys=["_k"], join_type="left outer").select(order)
        return tab.join(lt, keys=["_k"], join_type="inner").select(order)

    return _as_dataset(large).select_columns([large_on] + large_cols).map_batches(
        join_fn, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )


def _bcast_table(ref):
    # per-worker LRU (size 4): concurrently-pipelined broadcast joins
    # (e.g. a 4-deep star-join chain) interleave their map tasks on the
    # same worker — a capacity-1 clear-on-miss cache would thrash,
    # re-fetching the table per batch; bcast.cached bounds pinning
    # without the thrash
    from engine.rayds.bcast import cached

    return cached(ref)


def _probe_small(ds, budget: int = BROADCAST_JOIN_MAX_ROWS):
    """Bounded size probe that never double-executes.

    Fast path: when the plan's row count is metadata-known (a pure
    parquet read, ``from_arrow``, or an already-materialized dataset)
    ``_meta_count()`` answers without ANY execution (~1 ms vs the
    ~0.25 s fixed cost of a streaming-executor run) and the ORIGINAL
    dataset is returned as the complete broadcast side.  A read with a
    pushed-down filter can only over-count here, which errs toward the
    hash plan — never toward an unbounded broadcast collect.

    Slow path (mapped/filtered upstreams): stream at most ``budget + 1``
    rows into a materialized prefix.  If the prefix holds ≤ budget rows
    it IS the complete dataset — the caller reuses it directly for the
    broadcast plan (the upstream pipeline ran exactly once).  Past the
    budget only a bounded prefix was executed and the original lazy
    dataset is used for the hash plan.

    Returns (fits: bool, complete_ds_or_None)."""
    if isinstance(ds, pa.Table):
        return (ds.num_rows <= budget), ds
    try:
        n = ds._meta_count()
    except Exception:
        n = None
    if n is not None:
        return (True, ds) if n <= budget else (False, None)
    try:
        prefix = ds.limit(budget + 1).materialize()
        n = prefix.count()
    except Exception:
        return False, None
    if n <= budget:
        return True, prefix
    return False, None


def equi_join(left, right, left_on: str, right_on: str,
              left_cols: list[str], right_cols: list[str],
              num_parts: int = HASH_PARTS, join_type: str = "inner"):
    """Adaptive equi-join: broadcast a side map-side when it fits
    ``BROADCAST_JOIN_MAX_ROWS`` (the small-dimension-table case — zero
    shuffles), else the generic tagged-union hash join (big-big; all
    pyarrow join types — full outer always hashes, since a per-batch
    broadcast join would re-emit the broadcast side's unmatched rows
    once per batch).

    The size probe (``_probe_small``) is a streaming ``limit`` whose
    materialized prefix is REUSED as the broadcast side, so a non-trivial
    upstream pipeline (filters, maps) executes exactly once on the
    chosen plan — never count-then-re-execute.  Output column order is
    canonical _k + left_cols + right_cols on every plan.

    Either side may be a driver-resident ``pyarrow.Table`` (e.g. from
    ``dim_table``) — probed by ``num_rows`` and broadcast with zero Ray
    executions when it fits; converted via ``from_arrow`` if the hash
    plan is chosen."""
    canon = ["_k"] + list(left_cols) + list(right_cols)
    if join_type == "inner":
        # broadcast whichever side fits (left probed first)
        fits, small = _probe_small(left)
        if fits:
            return broadcast_equi_join(
                small, right, left_on, right_on, left_cols, right_cols,
                col_order=canon,
            )
        fits, small = _probe_small(right)
        if fits:
            return broadcast_equi_join(
                small, left, right_on, left_on, right_cols, left_cols,
                col_order=canon,
            )
    elif join_type == "left outer":
        # the preserved side must be the STREAMED one — broadcast the
        # right side when it fits
        fits, small = _probe_small(right)
        if fits:
            return broadcast_equi_join(
                small, left, right_on, left_on, right_cols, left_cols,
                preserve_large=True, col_order=canon,
            )
    elif join_type == "right outer":
        fits, small = _probe_small(left)
        if fits:
            return broadcast_equi_join(
                small, right, left_on, right_on, left_cols, right_cols,
                preserve_large=True, col_order=canon,
            )
    return hash_equi_join(
        _as_dataset(left), _as_dataset(right), left_on, right_on,
        left_cols, right_cols, num_parts, join_type=join_type,
    )


def _as_dataset(x):
    if isinstance(x, pa.Table):
        import ray.data

        return ray.data.from_arrow(x)
    return x


def dim_table(path: str, columns: list[str],
              budget: int = BROADCAST_JOIN_MAX_ROWS) -> pa.Table:
    """Driver-side read of a SMALL dimension parquet (the canonical
    broadcast-small-side pattern: read once on the driver, ``ray.put``
    once inside the broadcast join, look up in every task).  Bounded:
    raises if the file exceeds the broadcast budget — callers use this
    only for tables whose size is scale-invariant (e.g. TPC-H ``region``
    = 5 rows, ``nation`` = 25 rows at EVERY scale factor); anything that
    grows with the data goes through the adaptive ``equi_join`` probe
    instead."""
    import pyarrow.parquet as pq

    meta_rows = pq.ParquetFile(path).metadata.num_rows
    if meta_rows > budget:
        raise ValueError(
            f"dim_table({path}): {meta_rows} rows exceeds the broadcast "
            f"budget {budget}; use a Dataset + adaptive equi_join")
    return pq.read_table(path, columns=columns)
