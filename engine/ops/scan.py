"""Distributed prefix sum (scan) + concat-and-chunk sequence packing.

``ordered_cumsum`` is the classic two-phase distributed scan (the
primitive behind sequence packing, global row numbering, offset
assignment):

- pass 1: per block, ONE tiny row (min key, max key, block sum) lands
  on the driver; the driver sorts by key range, VERIFIES the blocks
  partition the key space (no overlap — the scan order is the key
  order, so overlapping blocks would make the scan ill-defined), and
  exclusive-scans the block sums into per-block offsets;
- pass 2: the offsets broadcast once (dict keyed by block min); each
  block adds its offset to a local vectorized cumsum.

No shuffle at any point; driver traffic is 3 ints per block.

``pack_sequences`` applies it to the canonical LLM-training op: concat
all documents (in key order) into one token stream and chunk it into
fixed-capacity training sequences — each doc gets its global token
offset and the sequence id it starts in.  Mirrors 1:1 to SQL window
functions (SUM OVER ... ROWS UNBOUNDED PRECEDING), so the whole thing
is ★ oracle-checkable.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def ordered_cumsum(ds, key_col: str, val_col: str,
                   out_col: str = "cumsum_excl"):
    """+ ``out_col`` = EXCLUSIVE prefix sum of ``val_col`` in ``key_col``
    order.  Requires rows sorted by key within blocks and block key
    ranges non-overlapping (true for a source written in key order —
    verified on the driver, ValueError otherwise)."""
    import ray

    def block_meta(batch: pa.Table) -> pa.Table:
        k = batch[key_col].to_numpy()
        v = batch[val_col].to_numpy().astype(np.int64)
        if len(k) == 0:
            return pa.table({"_kmin": pa.array([], type=pa.int64()),
                             "_kmax": pa.array([], type=pa.int64()),
                             "_sum": pa.array([], type=pa.int64())})
        if len(k) > 1 and not (np.diff(k) >= 0).all():
            raise ValueError(f"rows not sorted by {key_col} within block")
        return pa.table({
            "_kmin": pa.array([int(k[0])], type=pa.int64()),
            "_kmax": pa.array([int(k[-1])], type=pa.int64()),
            "_sum": pa.array([int(v.sum())], type=pa.int64()),
        })

    metas = [
        r for r in ds.select_columns([key_col, val_col]).map_batches(
            block_meta, batch_format="pyarrow", batch_size=None,
            zero_copy_batch=True,
        ).take_all()
    ]
    metas.sort(key=lambda r: r["_kmin"])
    for a, b in zip(metas, metas[1:]):
        if b["_kmin"] <= a["_kmax"]:
            raise ValueError(
                "block key ranges overlap — input must be key-partitioned "
                f"(block ending {a['_kmax']} vs block starting {b['_kmin']})"
            )
    offsets = {}
    acc = 0
    for r in metas:
        offsets[int(r["_kmin"])] = acc
        acc += int(r["_sum"])
    off_ref = ray.put(offsets)

    def apply(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch.append_column(
                out_col, pa.array([], type=pa.int64()))
        off = ray.get(off_ref)[int(batch[key_col][0].as_py())]
        v = batch[val_col].to_numpy().astype(np.int64)
        excl = np.cumsum(v) - v + off
        return batch.append_column(out_col, pa.array(excl))

    return ds.map_batches(apply, batch_format="pyarrow", batch_size=None,
                          zero_copy_batch=True)


def pack_sequences(docs_ds, capacity: int, id_col: str = "doc_id",
                   text_col: str = "text"):
    """Concat-and-chunk packing: (doc_id, n_tokens, tok_offset, seq_id)
    — ``tok_offset`` is the doc's start in the global token stream
    (docs concatenated in id order), ``seq_id = tok_offset // capacity``
    the fixed-size training sequence it starts in.  Token count =
    single-space split (count(' ')+1 — the SQL-mirrorable definition
    shared with token_stats)."""
    import pyarrow.compute as pc

    def count_tokens(batch: pa.Table) -> pa.Table:
        n = pc.cast(pc.add(pc.count_substring(batch[text_col], " "), 1),
                    pa.int64())
        return pa.table({id_col: batch[id_col], "n_tokens": n})

    toks = docs_ds.select_columns([id_col, text_col]).map_batches(
        count_tokens, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True,
    )
    scanned = ordered_cumsum(toks, id_col, "n_tokens", out_col="tok_offset")

    def assign(batch: pa.Table) -> pa.Table:
        off = batch["tok_offset"].to_numpy()
        return batch.append_column(
            "seq_id", pa.array(off // capacity)
        )

    return scanned.map_batches(assign, batch_format="pyarrow",
                               batch_size=None, zero_copy_batch=True)


def shuffle_positions(ds, id_col: str):
    """DETERMINISTIC GLOBAL SHUFFLE of a training corpus: every row gets
    its 0-based position in the md5-of-id order — the reproducible
    pre-training data permutation (same ids → same order, any cluster
    size, no RNG state).

    Plan: vectorized MD5 top-64-bit sort key per block (no per-row
    hashlib), Ray Data's native distributed sort (range-partitioned
    all-to-all) on (key, id), then the two-phase distributed prefix sum
    assigns global positions — 3 ints per block to the driver, no
    second shuffle.  The int64 key preserves the full hex-string order
    unless two ids collide in md5's top 64 bits (≈ n²/2⁶⁵; the scan's
    non-overlap verification turns a collision at a block boundary into
    a loud ValueError, never a silent misorder)."""
    import pyarrow as pa

    from engine.ops.vhash import md5_top64_key

    def key(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        h = md5_top64_key(ids.astype(str))
        return pa.table({id_col: batch[id_col],
                         "_h": pa.array(h),
                         "_one": pa.array(np.ones(len(h), dtype=np.int64))})

    keyed = ds.select_columns([id_col]).map_batches(
        key, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    # pin the sort's block boundaries: the scan reads the dataset twice
    # (meta pass + apply pass) and a re-executed sort may split blocks
    # differently.  The sort is an all-to-all that materializes its
    # output internally anyway; this only pins (id, key, 1) — never the
    # payload columns.
    srt = keyed.sort(["_h", id_col]).materialize()
    pos = ordered_cumsum(srt, key_col="_h", val_col="_one", out_col="pos")
    return pos.map_batches(
        lambda b: b.select([id_col, "pos"]),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
