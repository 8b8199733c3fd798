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


def ewma_sum(ds, key: str, order_cols: list[str], val_col: str,
             span: int = 10, id_col: str | None = None,
             num_parts: int = 64):
    """→ Dataset (id_col?, key, ewma_num BIGINT, ewma_den BIGINT,
    ewma DOUBLE): per-key EXPONENTIALLY weighted trailing window over
    the last ``span`` rows with DYADIC weights 2^(span-1-d) for lag d —
    num/den stay exact int64 (each term is value × a power of two), so
    the float ewma is ONE division of exact integers, bit-identical to
    a SQL oracle stating the same shifted-join sum.  Same plan as
    rolling_sum: one hash exchange, per-partition lexsort, ``span``
    vectorized shifted adds gated at key-run starts."""
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
            out["ewma_num"] = pa.array([], type=pa.int64())
            out["ewma_den"] = pa.array([], type=pa.int64())
            out["ewma"] = pa.array([], type=pa.float64())
            return pa.table(out)
        seg_start_mask = np.r_[True, k[1:] != k[:-1]]
        seg_start = np.maximum.accumulate(
            np.where(seg_start_mask, np.arange(n), 0))
        idx = np.arange(n)
        num = np.zeros(n, dtype=np.int64)
        den = np.zeros(n, dtype=np.int64)
        for d in range(span):
            wt = np.int64(1) << np.int64(span - 1 - d)
            ok = idx - d >= seg_start
            num[ok] += v[idx[ok] - d] * wt
            den[ok] += wt
        out = {key: pa.array(k)}
        if id_col:
            out[id_col] = g[id_col].take(pa.array(order))
        out["ewma_num"] = pa.array(num)
        out["ewma_den"] = pa.array(den)
        out["ewma"] = pa.array(num.astype(np.float64)
                               / den.astype(np.float64))
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


def time_range_sum(ds, key: str, ts_col: str, val_col: str,
                   preceding: int, id_col: str,
                   out_cols=("win_sum", "win_n"), num_parts: int = 64):
    """Per-key RANGE-FRAME window aggregate — SQL ``SUM(val) OVER
    (PARTITION BY key ORDER BY ts RANGE BETWEEN p PRECEDING AND CURRENT
    ROW)``: each row's sum/count over the rows whose ``ts`` falls in
    ``[ts_i − p, ts_i]`` (peers with EQUAL ts are all in the frame, on
    both sides of the row — the SQL RANGE-frame peer rule).

    Complements ``rolling_sum`` (ROWS frame): the frame here is defined
    on the VALUE axis, so frame width varies per row — the trailing
    time-window feature shape (spend in the last hour, requests in the
    last minute).

    Plan (one exchange, fully vectorized): hash exchange on the key;
    per partition a lexsort by (key, ts), then BOTH frame bounds fall
    out of two ``np.searchsorted`` calls over a composite
    ``key_rank * span + (ts − ts_min)`` int64 key (span > dt_max +
    preceding + 1 keeps the probe inside the row's key segment), and
    the sum is an exact integer cumsum difference.  ``val_col`` must be
    integral.  If the composite would overflow int64 (≥2^62 — only at
    astronomically wide partitions), a per-key-segment searchsorted
    fallback runs instead (bounded by distinct keys in the partition).
    """
    cols = list(dict.fromkeys([key, ts_col, val_col, id_col]))
    p = int(preceding)

    def part_fn(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_part"])
        n = g.num_rows
        if n == 0:
            return pa.table({key: g[key], id_col: g[id_col],
                             out_cols[0]: pa.array([], type=pa.int64()),
                             out_cols[1]: pa.array([], type=pa.int64())})
        k = g[key].to_numpy(zero_copy_only=False)
        ts = g[ts_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = g[val_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ts, k))
        k, ts, v = k[order], ts[order], v[order]
        new_key = np.r_[True, k[1:] != k[:-1]]
        krank = np.cumsum(new_key) - 1
        dt = ts - ts.min()
        span = int(dt.max()) + p + 2
        cum = np.cumsum(v)
        if int(krank[-1] + 1) * span < 2**62:
            comp = krank * span + dt
            lo = np.searchsorted(comp, comp - p, side="left")
            hi = np.searchsorted(comp, comp, side="right")
        else:  # pragma: no cover - astronomically wide partitions
            lo = np.empty(n, dtype=np.int64)
            hi = np.empty(n, dtype=np.int64)
            starts = np.nonzero(new_key)[0]
            ends = np.append(starts[1:], n)
            for s, e in zip(starts, ends):
                seg = ts[s:e]
                lo[s:e] = s + np.searchsorted(seg, seg - p, side="left")
                hi[s:e] = s + np.searchsorted(seg, seg, side="right")
        s = cum[hi - 1] - np.where(lo > 0, cum[lo - 1], 0)
        cnt = (hi - lo).astype(np.int64)
        return pa.table({key: pa.array(k),
                         id_col: g[id_col].take(pa.array(order)),
                         out_cols[0]: pa.array(s.astype(np.int64)),
                         out_cols[1]: pa.array(cnt)})

    from engine.rayds.shuffle import hash_exchange_groups

    return hash_exchange_groups(ds.select_columns(cols), [key], part_fn,
                                num_parts)


def markov_transitions(ds, key: str, order_cols: list[str],
                       state_col: str,
                       out_cols=("prev_state", "next_state", "n"),
                       num_parts: int = 64, fold_width: int = 64):
    """Global first-order Markov TRANSITION COUNTS: for each key's
    rows ordered by ``order_cols``, count every consecutive
    (state_i → state_{i+1}) pair across all keys — the event-sequence
    transition matrix (SQL: ``lag() OVER (PARTITION BY key ORDER BY
    ...)`` + GROUP BY).

    Plan: ONE hash exchange on the key co-locates and orders each
    key's rows; per partition the pair counting is pure vector work
    (Arrow dictionary codes, one ``np.unique`` over a composite int)
    emitting ≤ |states|² rows; partials merge through a raw-task tree
    fold (the matrix is tiny by contract — never an all-to-all).
    Returns a driver-side ``pa.Table``."""
    import pyarrow.compute as pc

    cols = list(dict.fromkeys([key] + order_cols + [state_col]))

    def _empty(g):
        st = g.schema.field(state_col).type
        return pa.table({out_cols[0]: pa.array([], type=st),
                         out_cols[1]: pa.array([], type=st),
                         out_cols[2]: pa.array([], type=pa.int64())})

    def part_fn(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_part"])
        n = g.num_rows
        if n < 2:
            return _empty(g)
        k = g[key].to_numpy(zero_copy_only=False)
        order_arrs = [g[c].to_numpy(zero_copy_only=False)
                      for c in order_cols]
        order = np.lexsort(tuple(reversed([k] + order_arrs)))
        k = k[order]
        states = g[state_col].take(pa.array(order))
        if isinstance(states, pa.ChunkedArray):
            states = states.combine_chunks()
        enc = pc.dictionary_encode(states)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = enc.dictionary
        prev_idx = np.nonzero(k[1:] == k[:-1])[0]
        if len(prev_idx) == 0:
            return _empty(g)
        nc = int(codes.max()) + 1
        pair = codes[prev_idx] * nc + codes[prev_idx + 1]
        uniq, cnt = np.unique(pair, return_counts=True)
        return pa.table({
            out_cols[0]: vocab.take(pa.array(uniq // nc)),
            out_cols[1]: vocab.take(pa.array(uniq % nc)),
            out_cols[2]: pa.array(cnt.astype(np.int64)),
        })

    def combine(tbls: list[pa.Table]) -> pa.Table:
        t = pa.concat_tables(tbls, promote_options="permissive")
        if t.num_rows == 0:
            return tbls[0]
        a = pc.dictionary_encode(t[out_cols[0]].combine_chunks())
        b = pc.dictionary_encode(t[out_cols[1]].combine_chunks())
        if isinstance(a, pa.ChunkedArray):
            a = a.combine_chunks()
        if isinstance(b, pa.ChunkedArray):
            b = b.combine_chunks()
        ac = a.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        bc = b.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        nb = int(bc.max()) + 1
        pair = ac * nb + bc
        uniq, inv = np.unique(pair, return_inverse=True)
        sums = np.bincount(inv, weights=t[out_cols[2]]
                           .to_numpy(zero_copy_only=False)).astype(np.int64)
        return pa.table({
            out_cols[0]: a.dictionary.take(pa.array(uniq // nb)),
            out_cols[1]: b.dictionary.take(pa.array(uniq % nb)),
            out_cols[2]: pa.array(sums),
        })

    from engine.rayds.shuffle import hash_exchange_groups, tree_fold_refs

    partials = hash_exchange_groups(ds.select_columns(cols), [key],
                                    part_fn, num_parts)
    return tree_fold_refs(partials, combine, width=fold_width)


def windowed_followups(ds, key: str, ts_col: str, id_col: str,
                       state_col: str, window: int,
                       out_cols=("t1", "t2", "n"),
                       num_parts: int = 64, fold_width: int = 64):
    """WINDOWED CO-OCCURRENCE COUNTS: for every ordered pair of rows of
    the same key with 0 < (ts_j, id_j) − (ts_i, id_i) and
    ts_j ≤ ts_i + window, count (state_i → state_j) — the
    "what happens within W after X" feature (generalizes
    ``markov_transitions``' next-1 to a TIME window).

    ONE hash exchange on the key; per partition the window end of every
    row falls out of one ``searchsorted`` over the composite
    (key_rank·span + dt) int64 (the ``time_range_sum`` trick, forward
    direction), the pair explode is pure offset arithmetic bounded by
    the window occupancy, and the ≤ |states|² count partials merge
    through the raw-task tree fold.  Returns a driver-side table."""
    import pyarrow.compute as pc

    cols = list(dict.fromkeys([key, ts_col, id_col, state_col]))
    w = int(window)

    def _empty(g):
        st = g.schema.field(state_col).type
        return pa.table({out_cols[0]: pa.array([], type=st),
                         out_cols[1]: pa.array([], type=st),
                         out_cols[2]: pa.array([], type=pa.int64())})

    def part_fn(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_part"])
        n = g.num_rows
        if n < 2:
            return _empty(g)
        k = g[key].to_numpy(zero_copy_only=False)
        ts = g[ts_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = g[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, ts, k))
        k, ts = k[order], ts[order]
        states = g[state_col].take(pa.array(order))
        if isinstance(states, pa.ChunkedArray):
            states = states.combine_chunks()
        enc = pc.dictionary_encode(states)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = enc.dictionary
        new_key = np.r_[True, k[1:] != k[:-1]]
        krank = np.cumsum(new_key) - 1
        dt = ts - ts.min()
        span = int(dt.max()) + w + 2
        if int(krank[-1] + 1) * span >= 2**62:  # pragma: no cover
            raise ValueError("windowed_followups: partition too wide "
                             "for the composite key")
        comp = krank * span + dt
        hi = np.searchsorted(comp, comp + w, side="right")
        idx = np.arange(n, dtype=np.int64)
        cnt = hi - idx - 1
        if int(cnt.sum()) == 0:
            return _empty(g)
        csum = np.concatenate([[0], np.cumsum(cnt)])
        first = np.repeat(idx, cnt)
        second = (np.arange(csum[-1], dtype=np.int64)
                  - np.repeat(csum[:-1], cnt) + first + 1)
        nc = int(codes.max()) + 1
        pair = codes[first] * nc + codes[second]
        uniq, c = np.unique(pair, return_counts=True)
        return pa.table({
            out_cols[0]: vocab.take(pa.array(uniq // nc)),
            out_cols[1]: vocab.take(pa.array(uniq % nc)),
            out_cols[2]: pa.array(c.astype(np.int64)),
        })

    def combine(tbls: list[pa.Table]) -> pa.Table:
        t = pa.concat_tables(tbls, promote_options="permissive")
        if t.num_rows == 0:
            return tbls[0]
        gb = t.group_by([out_cols[0], out_cols[1]]).aggregate(
            [(out_cols[2], "sum")])
        return gb.rename_columns(list(out_cols))

    from engine.rayds.shuffle import hash_exchange_groups, tree_fold_refs

    partials = hash_exchange_groups(ds.select_columns(cols), [key],
                                    part_fn, num_parts)
    return tree_fold_refs(partials, combine, width=fold_width)


def running_total(ds, key: str, ts_col: str, id_col: str, val_col: str,
                  out_col: str = "running", num_parts: int = 64):
    """Per-key CUMULATIVE SUM (SQL ``SUM(val) OVER (PARTITION BY key
    ORDER BY ts, id ROWS UNBOUNDED PRECEDING)``) — completes the
    window-frame family (ROWS-k = ``rolling_sum``, RANGE-time =
    ``time_range_sum``, unbounded = here).  One hash exchange on the
    key; per partition a lexsort + one int64 cumsum with per-key-run
    rebasing (subtract the run-start prefix)."""
    cols = list(dict.fromkeys([key, ts_col, id_col, val_col]))

    def part_fn(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_part"])
        n = g.num_rows
        if n == 0:
            return pa.table({key: g[key], id_col: g[id_col],
                             out_col: pa.array([], type=pa.int64())})
        k = g[key].to_numpy(zero_copy_only=False)
        ts = g[ts_col].to_numpy(zero_copy_only=False)
        ids = g[id_col].to_numpy(zero_copy_only=False)
        v = g[val_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ids, ts, k))
        k, v = k[order], v[order]
        cum = np.cumsum(v)
        new = np.r_[True, k[1:] != k[:-1]]
        starts = np.nonzero(new)[0]
        base = np.repeat(cum[starts] - v[starts],
                         np.diff(np.append(starts, n)))
        return pa.table({key: pa.array(k),
                         id_col: g[id_col].take(pa.array(order)),
                         out_col: pa.array(cum - base)})

    from engine.rayds.shuffle import hash_exchange_groups

    return hash_exchange_groups(ds.select_columns(cols), [key], part_fn,
                                num_parts)


def record_high_counts(ds, key: str, ts_col: str, id_col: str,
                       val_col: str, num_parts: int = 64):
    """Per-key RECORD-HIGH counter: how many of a key's events strictly
    exceed every earlier value in (ts, id) order (the running-max /
    new-personal-best screen; first event counts).  SQL mirror:
    ``value > max(value) OVER (... ROWS UNBOUNDED PRECEDING AND 1
    PRECEDING)`` with the NULL first frame counted.

    One hash exchange on the key.  The per-partition kernel is fully
    vectorized across key runs via a composite-rank prefix max: values
    dense-rank to int64 (order-isomorphic), each row's composite is
    run_id·(nv+1) + rank+1 — a later run's composites strictly dominate
    every earlier run's, so ONE global ``np.maximum.accumulate`` yields
    the per-run prefix max and ``record ⟺ composite > shifted prefix
    max`` (run firsts compare against a smaller-run composite and win).
    Strictness is exact: equal values share a rank, so a tie is never a
    record."""
    cols = list(dict.fromkeys([key, ts_col, id_col, val_col]))

    def part_fn(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_part"])
        n = g.num_rows
        if n == 0:
            return pa.table({key: g[key],
                             "n_records": pa.array([], type=pa.int64()),
                             "n_events": pa.array([], type=pa.int64())})
        k = g[key].to_numpy(zero_copy_only=False)
        ts = g[ts_col].to_numpy(zero_copy_only=False)
        ids = g[id_col].to_numpy(zero_copy_only=False)
        v = g[val_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, ts, k))
        k, v = k[order], v[order]
        _, rank = np.unique(v, return_inverse=True)
        nv = len(_)
        new = np.r_[True, k[1:] != k[:-1]]
        run_id = np.cumsum(new) - 1
        comp = run_id.astype(np.int64) * (nv + 1) + rank + 1
        shifted = np.r_[np.int64(0), np.maximum.accumulate(comp)[:-1]]
        rec = (comp > shifted).astype(np.int64)
        starts = np.flatnonzero(new)
        counts = np.diff(np.append(starts, n))
        recs = np.add.reduceat(rec, starts)
        return pa.table({key: pa.array(k[starts]),
                         "n_records": pa.array(recs),
                         "n_events": pa.array(counts.astype(np.int64))})

    from engine.rayds.shuffle import hash_exchange_groups

    return hash_exchange_groups(ds.select_columns(cols), [key], part_fn,
                                num_parts)
