"""Heavy hitters (frequent items) with ZERO shuffles — Misra–Gries
candidates + exact broadcast recount.

The bounded-memory alternative to an exact grouped count when the key
cardinality is corpus-sized (words, URLs, n-grams at 10^12 rows): an
exact ``groupby(word)`` is an all-to-all over every distinct key, while
this operator moves only

- stage 1: one ≤k-row Misra–Gries summary PER BLOCK to the driver
  (k·blocks tiny rows; the standard mergeable MG guarantee — a key's
  summary undercount is bounded by the total decrement applied, Misra &
  Gries 1982 / Berinde et al. 2010 for the merge), and
- stage 2: the ≤k candidate keys broadcast once via ``ray.put``; each
  block counts ONLY candidate matches (hashed ``is_in`` prefilter +
  group_by) and the per-block partials — ≤k rows each — fold on the
  driver into EXACT counts.

Output: the true top-``m`` (exact counts, deterministic (cnt desc, key
asc) order) whenever every true top-m key survives the summaries.
``mg_threshold`` — the summed decrement bound — is returned so callers
can CHECK that: any key absent from the candidate set has true count
≤ mg_threshold, so the result is PROVABLY the true top-m whenever the
m-th recounted count exceeds it.  Choose k ≫ m (default 64×) so
real-corpus skew makes the bound trivially met.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _mg_compress(keys: pa.Array, counts: np.ndarray, k: int):
    """Reduce a (key, count) summary to ≤ k entries by the MG decrement:
    subtract the (k+1)-th largest count from all, keep positives.
    Returns (keys, counts, decrement)."""
    if len(counts) <= k:
        return keys, counts, 0
    dec = int(np.partition(counts, -(k + 1))[-(k + 1)])
    idx = np.nonzero(counts > dec)[0]
    return keys.take(pa.array(idx)), counts[idx] - dec, dec


def _summarize(keys: pa.Array, counts: np.ndarray, dec: int, k: int,
               key_col: str) -> pa.Table:
    """Compress a (key, count) summary to ≤k rows and append the dec
    SENTINEL row (null key) carrying the accumulated decrement — the one
    canonical serialization used by the block stage, the tree fold and
    the driver (decrements must never be lost or deduplicated)."""
    keys, counts, mdec = _mg_compress(keys, counts, k)
    dec += mdec
    n = len(counts)
    out_keys, out_cnt = keys, counts
    out_dec = np.zeros(n, dtype=np.int64)
    if dec > 0:
        out_keys = pa.concat_arrays([keys, pa.nulls(1, type=keys.type)])
        out_cnt = np.concatenate([counts, [0]])
        out_dec = np.concatenate([out_dec, [dec]])
    return pa.table({key_col: out_keys, "_mgc": pa.array(out_cnt),
                     "_dec": pa.array(out_dec)})


def mg_partials(key_col: str, k: int):
    """Stage: per-block ≤k-row Misra–Gries summary of the key column.
    A block that decremented also emits ONE sentinel row (null key,
    ``_dec`` = its decrement) so the driver can sum the exact global
    error bound — decrements must never be lost or deduplicated."""

    def fn(batch: pa.Table) -> pa.Table:
        g = batch.select([key_col]).group_by([key_col]).aggregate(
            [([], "count_all")]
        )
        keys = g.column(0)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        counts = g.column(1).to_numpy().astype(np.int64)
        return _summarize(keys, counts, 0, k, key_col)

    return fn


def heavy_hitters(ds, key_col: str, m: int = 10, k: int | None = None):
    """EXACT top-``m`` (key, cnt) pyarrow Table + the MG guarantee check.

    Returns ``(table, mg_threshold)``: ``table`` holds the recounted
    exact top-m in (cnt desc, key asc) order; the result is PROVABLY
    the true top-m when ``table["cnt"][m-1] > mg_threshold``
    (callers/tests assert this)."""
    import ray

    k = k or max(64 * m, 256)

    # stage 1: blocks → ≤k-row MG summaries → WORKER tree fold (16-way,
    # so the driver sees ≤ 16·(k+1) rows however many input blocks there
    # are — at 10^6 blocks a flat driver fold would itself be the
    # bottleneck) → driver fold → candidates
    part = ds.select_columns([key_col]).map_batches(
        mg_partials(key_col, k), batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True,
    )

    def tree_merge(batch: pa.Table) -> pa.Table:
        dec = int(pc.sum(batch["_dec"]).as_py() or 0)
        real = batch.filter(pc.is_valid(batch[key_col]))
        g = real.group_by([key_col]).aggregate([("_mgc", "sum")])
        keys = g.column(0)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        counts = g.column(1).to_numpy().astype(np.int64)
        return _summarize(keys, counts, dec, k, key_col)

    from engine.rayds.shuffle import tree_fold_refs

    summaries = tree_fold_refs(
        part, lambda tbls: tree_merge(pa.concat_tables(tbls)
                                      .combine_chunks()))

    def _empty_result(dec: int):
        # key type from the INPUT schema (not hardcoded string)
        try:
            sch = ds.schema(fetch_if_missing=True)
            ktype = sch.base_schema.field(key_col).type
        except Exception:
            ktype = pa.string()
        return pa.table({key_col: pa.array([], type=ktype),
                         "cnt": pa.array([], type=pa.int64())}), dec

    if summaries.num_columns == 0:  # empty input: schema-less fold
        return _empty_result(0)
    dec_sum = int(pc.sum(summaries["_dec"]).as_py() or 0)
    real = summaries.filter(pc.is_valid(summaries[key_col]))
    if real.num_rows == 0:
        return _empty_result(dec_sum)
    g = real.group_by([key_col]).aggregate([("_mgc", "sum")])
    keys = g.column(0)
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    counts = g.column(1).to_numpy().astype(np.int64)
    keys, counts, merge_dec = _mg_compress(keys, counts, k)
    mg_threshold = dec_sum + merge_dec

    # stage 2: broadcast candidates, exact recount (per-block ≤k rows)
    cand_ref = ray.put(keys)

    from engine.rayds.bcast import cached

    def recount(batch: pa.Table) -> pa.Table:
        cand = cached(cand_ref)
        col = batch[key_col]
        t = batch.select([key_col]).filter(pc.is_in(col, value_set=cand))
        g = t.group_by([key_col]).aggregate([([], "count_all")])
        return g.rename_columns([key_col, "_cnt"])

    rec = ds.select_columns([key_col]).map_batches(
        recount, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )

    def sum_merge(batch: pa.Table) -> pa.Table:
        g = batch.group_by([key_col]).aggregate([("_cnt", "sum")])
        return g.rename_columns([key_col, "_cnt"])

    # same raw-task tree fold as stage 1: the recount partials are ≤k
    # rows per block, but blocks×k must not land on the driver raw
    folded = tree_fold_refs(
        rec, lambda tbls: sum_merge(pa.concat_tables(tbls)
                                    .combine_chunks()))
    fin = folded.group_by([key_col]).aggregate([("_cnt", "sum")])
    # deterministic (cnt desc, key asc): sort by key first, then a
    # STABLE argsort on -count preserves the key order within ties
    ix = pc.sort_indices(fin, sort_keys=[(key_col, "ascending")])
    fk = fin.column(0).take(ix)
    if isinstance(fk, pa.ChunkedArray):
        fk = fk.combine_chunks()
    fc = fin.column(1).to_numpy()[ix.to_numpy()].astype(np.int64)
    order = np.argsort(-fc, kind="stable")[:m]
    return pa.table({
        key_col: fk.take(pa.array(order)),
        "cnt": pa.array(fc[order]),
    }), mg_threshold
