"""Per-key ROLLING-FRAME window aggregate (ROWS BETWEEN k PRECEDING AND
CURRENT ROW) — the moving-average / sliding-sum shape of time-series
feature pipelines, expressed Ray-Data-first.

Reference parity: extends the engine past the reference's surface
(shapely has no window functions); semantics pinned by the DuckDB
window-frame oracle in ``__ray_entry__.oracle_sql``.

Plan (one exchange, fully vectorized):

- ONE hash exchange co-locates each key's rows (the sessionize /
  trajectory co-partitioning contract; a 10^9-row hot key would take
  the ``sessionize_split`` time-bucket treatment — documented, not
  implemented here).
- Per partition: lexsort by (key, *order_cols), integer cumsum per key
  segment, frame sum = ``cum[i] − cum[i−k−1]`` clipped at the segment
  start.  INTEGER addition is associative, so the cumsum-difference is
  EXACT — which is why the aggregated column must be integral (scale
  doubles to cents first).  The float mean is ONE fixed division per
  row (``sum / n``), mirrored verbatim by the SQL oracle.

Exchange volume = the projected input, once.  Output is per-row
(event grain), so it streams back out without a driver collect.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def rolling_sum(ds, key: str, order_cols: list[str], val_col: str,
                preceding: int, out_cols=("roll_sum", "roll_n", "roll_avg"),
                id_col: str | None = None, num_parts: int = 64):
    """→ Dataset (id_col?, key, *order_cols stripped, roll_sum BIGINT,
    roll_n BIGINT, roll_avg DOUBLE): per-key frame sum/count/mean over
    ROWS BETWEEN ``preceding`` PRECEDING AND CURRENT ROW, ordered by
    ``order_cols`` (ties broken by their full tuple — pass enough
    columns to make the order total, or the frame is ill-defined).

    ``val_col`` must be int64 (exact arithmetic — see module doc)."""
    cols = list(dict.fromkeys(
        [key] + order_cols + [val_col] + ([id_col] if id_col else [])))

    def part_fn(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_part"])
        k = g[key].to_numpy(zero_copy_only=False)
        order_arrs = [g[c].to_numpy(zero_copy_only=False)
                      for c in order_cols]
        v = g[val_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort(tuple(reversed([k] + order_arrs)))
        k = k[order]
        v = v[order]
        n = len(k)
        if n == 0:
            out = {key: g[key]}
            if id_col:
                out[id_col] = g[id_col]
            out[out_cols[0]] = pa.array([], type=pa.int64())
            out[out_cols[1]] = pa.array([], type=pa.int64())
            out[out_cols[2]] = pa.array([], type=pa.float64())
            return pa.table(out)
        seg_start_mask = np.r_[True, k[1:] != k[:-1]]
        seg_start = np.maximum.accumulate(
            np.where(seg_start_mask, np.arange(n), 0))
        cum = np.cumsum(v)
        lo = np.maximum(np.arange(n) - preceding, seg_start)
        s = cum - np.where(lo > 0, cum[lo - 1], 0)
        cnt = np.arange(n) - lo + 1
        avg = s.astype(np.float64) / cnt.astype(np.float64)
        out = {key: pa.array(k)}
        if id_col:
            out[id_col] = g[id_col].take(pa.array(order))
        out[out_cols[0]] = pa.array(s)
        out[out_cols[1]] = pa.array(cnt.astype(np.int64))
        out[out_cols[2]] = pa.array(avg)
        return pa.table(out)

    from engine.rayds.shuffle import hash_exchange_groups

    return hash_exchange_groups(ds.select_columns(cols), [key], part_fn,
                                num_parts)


def grouped_string_agg(ds, key: str, order_cols: list[str], val_col: str,
                       sep: str = ",", out_col: str = "agg",
                       num_parts: int = 64):
    """Per-key ORDERED string concatenation — SQL
    ``string_agg(val, sep ORDER BY order_cols)``.

    One hash exchange on the key; per partition a lexsort by
    (key, *order_cols) then ONE vectorized ``pc.binary_join`` over a
    ListArray built from the key-run offsets — no per-row (or even
    per-group) Python string work.  Output is one row per key; a key
    whose concatenated payload exceeds a partition's memory is the same
    documented hot-key limit as the other per-key windowed operators."""
    import pyarrow.compute as pc

    cols = [key] + order_cols + [val_col]

    def part_fn(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_part"])
        k = g[key].to_numpy(zero_copy_only=False)
        order_arrs = [g[c].to_numpy(zero_copy_only=False)
                      for c in order_cols]
        order = np.lexsort(tuple(reversed([k] + order_arrs)))
        n = len(k)
        if n == 0:
            return pa.table({key: g[key],
                             out_col: pa.array([], type=pa.string())})
        k = k[order]
        vals = g[val_col].take(pa.array(order))
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        if isinstance(vals, pa.ChunkedArray):  # older pyarrow returns CA
            vals = (vals.chunk(0) if vals.num_chunks
                    else pa.array([], type=vals.type))
        starts = np.nonzero(np.r_[True, k[1:] != k[:-1]])[0]
        offsets = np.append(starts, n).astype(np.int32)
        lists = pa.ListArray.from_arrays(pa.array(offsets), vals)
        joined = pc.binary_join(lists, sep)
        return pa.table({key: pa.array(k[starts]), out_col: joined})

    from engine.rayds.shuffle import hash_exchange_groups

    return hash_exchange_groups(ds.select_columns(cols), [key], part_fn,
                                num_parts)


def grouped_ntile(ds, key: str, order_cols: list[str], n_buckets: int,
                  id_col: str, out_col: str = "bucket",
                  num_parts: int = 64):
    """Per-key NTILE(n) — each row's equal-frequency bucket (1-based)
    within its key partition, ordered by ``order_cols`` (pass enough
    columns for a total order; SQL NTILE is otherwise nondeterministic).

    One hash exchange on the key; per partition a lexsort and a pure
    integer bucket formula (the SQL NTILE contract: the first ``n % k``
    buckets get ``ceil(n/k)`` rows) — exact at any partitioning."""

    cols = list(dict.fromkeys([key] + order_cols + [id_col]))

    def part_fn(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_part"])
        k = g[key].to_numpy(zero_copy_only=False)
        order_arrs = [g[c].to_numpy(zero_copy_only=False)
                      for c in order_cols]
        order = np.lexsort(tuple(reversed([k] + order_arrs)))
        n = len(k)
        if n == 0:
            return pa.table({id_col: g[id_col], key: g[key],
                             out_col: pa.array([], type=pa.int64())})
        k = k[order]
        starts_mask = np.r_[True, k[1:] != k[:-1]]
        seg_start = np.maximum.accumulate(
            np.where(starts_mask, np.arange(n), 0))
        starts = np.nonzero(starts_mask)[0]
        seg_len = np.diff(np.append(starts, n))
        seg_n = np.repeat(seg_len, seg_len)  # partition size per row
        pos = np.arange(n) - seg_start  # 0-based rank within partition
        q, r = seg_n // n_buckets, seg_n % n_buckets
        boundary = r * (q + 1)
        in_big = pos < boundary
        bucket = np.where(
            in_big,
            pos // np.maximum(q + 1, 1),
            r + (pos - boundary) // np.maximum(q, 1),
        ) + 1
        return pa.table({
            id_col: g[id_col].take(pa.array(order)),
            key: pa.array(k),
            out_col: pa.array(bucket.astype(np.int64)),
        })

    from engine.rayds.shuffle import hash_exchange_groups

    return hash_exchange_groups(ds.select_columns(cols), [key], part_fn,
                                num_parts)


def grouped_rank(ds, key: str, rank_col: str, id_cols: list[str],
                 num_parts: int = 64):
    """Per-key RANK / DENSE_RANK / PERCENT_RANK over ``rank_col`` — the
    ranking-window-function family (SQL ``RANK() OVER (PARTITION BY key
    ORDER BY rank_col)``).  All three depend only on the VALUE ordering,
    so ties need no breaker and the result is deterministic at any
    partitioning.

    One hash exchange on the key; per partition a lexsort by
    (key, rank_col) and pure integer run arithmetic:

    - ``rnk``  = 1 + rows before the first row of this value run,
    - ``drnk`` = value-run ordinal within the key,
    - ``prnk`` = ``(rnk - 1) / (n_key - 1)`` (0.0 for singleton keys) —
      ONE fixed division, mirrored verbatim by the SQL oracle, so the
      doubles are bit-exact."""
    cols = list(dict.fromkeys([key, rank_col] + id_cols))

    def part_fn(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_part"])
        k = g[key].to_numpy(zero_copy_only=False)
        v = g[rank_col].to_numpy(zero_copy_only=False)
        n = len(k)
        if n == 0:
            out = {c: g[c] for c in cols}
            out["rnk"] = pa.array([], type=pa.int64())
            out["drnk"] = pa.array([], type=pa.int64())
            out["prnk"] = pa.array([], type=pa.float64())
            return pa.table(out)
        order = np.lexsort((v, k))
        k, v = k[order], v[order]
        idx = np.arange(n, dtype=np.int64)
        key_new = np.r_[True, k[1:] != k[:-1]]
        val_new = key_new | np.r_[True, v[1:] != v[:-1]]
        key_start = np.maximum.accumulate(np.where(key_new, idx, 0))
        val_start = np.maximum.accumulate(np.where(val_new, idx, 0))
        rnk = val_start - key_start + 1
        runs = np.cumsum(val_new)  # global value-run ordinal
        drnk = runs - np.maximum.accumulate(
            np.where(key_new, runs - 1, 0))
        key_starts = np.nonzero(key_new)[0]
        seg_len = np.diff(np.append(key_starts, n))
        n_key = np.repeat(seg_len, seg_len)
        prnk = np.where(n_key > 1,
                        (rnk - 1) / np.maximum(n_key - 1, 1), 0.0)
        take = pa.array(order)
        out = {c: g[c].take(take) for c in cols}
        out["rnk"] = pa.array(rnk)
        out["drnk"] = pa.array(drnk)
        out["prnk"] = pa.array(prnk.astype(np.float64))
        return pa.table(out)

    from engine.rayds.shuffle import hash_exchange_groups

    return hash_exchange_groups(ds.select_columns(cols), [key], part_fn,
                                num_parts)
