"""Exact distributed statistics: integer-moment correlation, per-group
mode, and latest-per-key compaction (argmax-by).

Reference parity: these extend the engine past the reference's own
surface (shapely has no tabular stats); semantics are pinned by DuckDB
oracles in ``__ray_entry__.oracle_sql`` instead of reference files.

Design notes (100-TB posture):

- ``exact_corr`` never shuffles: per-block integer moment partials
  (6 numbers) ride a decimal128 tree fold — exact at any scale
  (decimal128(38) holds ~1e38; 1e12 rows × 1e14 per-product ≈ 1e26) —
  and the driver sees ≤16 partial rows regardless of block count.
- ``grouped_mode`` is combiner-first: blocks pre-count (key, value)
  pairs so the single exchange moves ≤ (distinct pairs × blocks) rows,
  then each partition argmaxes its keys locally.  Assumes one key's
  distinct-VALUE set fits a partition (the same contract as the exact
  grouped quantiles); past that, ``heavyhitters``' Misra–Gries path is
  the approximation.
- ``latest_by_key`` (streaming-upsert compaction) keeps ONE row per key
  per block before the exchange, so the all-to-all moves ≤ (keys ×
  blocks) rows, never the event stream.
"""
from __future__ import annotations

import decimal
import math

import numpy as np
import pyarrow as pa

DEC128 = pa.decimal128(38, 0)

_MOMENTS = ["n", "sx", "sy", "sxx", "syy", "sxy"]


def _int_col(tab: pa.Table, col: str, scale: int) -> np.ndarray:
    """Column → exact int64 (values are integral after ``scale``×)."""
    v = tab[col].to_numpy(zero_copy_only=False)
    if scale != 1:
        v = v * scale
    return np.rint(v).astype(np.int64)


def _moment_partial(xcol: str, ycol: str, xscale: int, yscale: int):
    """Per-block EXACT integer moments as one decimal128 row.

    Products are summed in int64 chunks sized from the block's actual
    max |x|,|y| so no chunk sum can overflow, then folded into Python
    ints (arbitrary precision) and emitted as decimal128.
    """

    def fn(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            vals = [0] * 6
        else:
            x = _int_col(batch, xcol, xscale)
            y = _int_col(batch, ycol, yscale)
            mx = max(int(np.abs(x).max()), 1)
            my = max(int(np.abs(y).max()), 1)
            # chunk so chunk_rows × max_product < 2^62 for every moment
            worst = max(mx * mx, my * my, mx * my)
            step = max(1, (1 << 62) // worst)
            n = len(x)
            sx = int(x.sum(dtype=np.int64)) if mx * n < (1 << 62) else sum(
                int(x[i:i + step].sum(dtype=np.int64)) for i in range(0, n, step))
            sy = int(y.sum(dtype=np.int64)) if my * n < (1 << 62) else sum(
                int(y[i:i + step].sum(dtype=np.int64)) for i in range(0, n, step))
            sxx = sum(int(np.sum(x[i:i + step] * x[i:i + step], dtype=np.int64))
                      for i in range(0, n, step))
            syy = sum(int(np.sum(y[i:i + step] * y[i:i + step], dtype=np.int64))
                      for i in range(0, n, step))
            sxy = sum(int(np.sum(x[i:i + step] * y[i:i + step], dtype=np.int64))
                      for i in range(0, n, step))
            vals = [n, sx, sy, sxx, syy, sxy]
        return pa.table({
            c: pa.array([decimal.Decimal(v)], type=DEC128)
            for c, v in zip(_MOMENTS, vals)
        })

    return fn


def _fold_moments(batch: pa.Table) -> pa.Table:
    if batch.num_rows == 0:
        return batch
    return pa.table({
        c: pa.array(
            [sum((d.as_py() or 0) for d in batch[c].combine_chunks())],
            type=DEC128,
        )
        for c in _MOMENTS
    })


def exact_moments(ds, xcol: str, ycol: str,
                  xscale: int = 1, yscale: int = 1) -> dict[str, int]:
    """EXACT integer moments (n, Σx, Σy, Σx², Σy², Σxy) of two scaled
    columns — zero shuffles, per-block partials through a 16-way worker
    tree fold, driver folds ≤16 decimal128 rows into Python ints."""
    part = ds.map_batches(
        _moment_partial(xcol, ycol, xscale, yscale),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
    )
    from engine.rayds.shuffle import tree_fold_refs

    folded = tree_fold_refs(
        part, lambda tbls: _fold_moments(pa.concat_tables(tbls)))
    out = {c: 0 for c in _MOMENTS}
    for c in _MOMENTS:
        for d in folded[c]:
            v = d.as_py()
            if v is not None:
                out[c] += int(v)
    return out


def exact_power_sums(c: np.ndarray) -> tuple[int, int, int, int]:
    """EXACT (Σc, Σc², Σc³, Σc⁴) for non-negative int64 ``c`` < 2²³,
    fully vectorized: c² < 2⁴⁶ splits into three 16-bit limbs, c into
    two; every limb product is < 2³², so int64 accumulation cannot
    overflow below 2³¹ rows per block, and the limb sums recombine into
    Python ints (arbitrary precision).  No per-row Python work — the
    overflow-safe form of the _moment_partial chunking for 3rd/4th
    powers, where the chunk step would degenerate to ~2 rows."""
    n = len(c)
    if n == 0:
        return 0, 0, 0, 0
    cmax = int(c.max())
    if cmax >= (1 << 23) or int(c.min()) < 0:
        # fall back to arbitrary-precision object math (rare: values
        # beyond ~$84k cents); still exact, just not vectorized
        v = c.astype(object)
        return (int(sum(v)), int(sum(v * v)), int(sum(v * v * v)),
                int(sum(v * v * v * v)))
    q = c * c  # < 2^46, exact in int64
    l0 = q & 0xFFFF
    l1 = (q >> 16) & 0xFFFF
    l2 = q >> 32  # < 2^14
    m0 = c & 0xFFFF
    m1 = c >> 16  # < 2^7
    s1 = int(c.sum())
    s2 = int(l0.sum()) + (int(l1.sum()) << 16) + (int(l2.sum()) << 32)
    # s3 = Σ q·c = Σ (l0 + l1·2^16 + l2·2^32)(m0 + m1·2^16)
    s3 = (int((l0 * m0).sum())
          + ((int((l0 * m1).sum()) + int((l1 * m0).sum())) << 16)
          + ((int((l1 * m1).sum()) + int((l2 * m0).sum())) << 32)
          + (int((l2 * m1).sum()) << 48))
    # s4 = Σ q² over the three q limbs
    s4 = (int((l0 * l0).sum())
          + (int((l0 * l1).sum()) << 17)          # 2·l0·l1·2^16
          + ((int((l1 * l1).sum())
              + (int((l0 * l2).sum()) << 1)) << 32)
          + (int((l1 * l2).sum()) << 49)          # 2·l1·l2·2^48
          + (int((l2 * l2).sum()) << 64))
    return s1, s2, s3, s4


def pearson_from_moments(m: dict[str, int]) -> float:
    """corr from exact integer moments.  FLOAT EVALUATION ORDER IS THE
    CONTRACT: float(n·Σxy − Σx·Σy) / (sqrt(float(n·Σxx − Σx²)) ·
    sqrt(float(n·Σyy − Σy²))) — the SQL oracle mirrors it term by term
    (integer diffs exact in HUGEINT, one rounding per CAST, IEEE sqrt
    and ·,/ are correctly rounded, so the doubles are bit-identical)."""
    n, sx, sy, sxx, syy, sxy = (m[c] for c in _MOMENTS)
    num = float(n * sxy - sx * sy)
    vx = float(n * sxx - sx * sx)
    vy = float(n * syy - sy * sy)
    if vx <= 0.0 or vy <= 0.0:
        return float("nan")
    return num / (math.sqrt(vx) * math.sqrt(vy))


def exact_corr(ds, xcol: str, ycol: str,
               xscale: int = 1, yscale: int = 1) -> pa.Table:
    """One-row table (n BIGINT, corr DOUBLE): exact-moment Pearson r."""
    m = exact_moments(ds, xcol, ycol, xscale, yscale)
    return pa.table({
        "n": pa.array([m["n"]], type=pa.int64()),
        "corr": pa.array([pearson_from_moments(m)], type=pa.float64()),
    })


# ---------------------------------------------------------------------------
# per-group mode


def _sortable(arr: np.ndarray) -> np.ndarray:
    """Order-isomorphic int codes for dtypes np.lexsort can't take
    (object/str); numeric arrays pass through untouched."""
    if arr.dtype.kind in "OUS":
        _, codes = np.unique(arr, return_inverse=True)
        return codes
    return arr


def _first_per_key_run(keys_sorted: np.ndarray) -> np.ndarray:
    """Indices of the first element of each equal-key run."""
    if len(keys_sorted) == 0:
        return np.empty(0, dtype=np.int64)
    first = np.ones(len(keys_sorted), dtype=bool)
    first[1:] = keys_sorted[1:] != keys_sorted[:-1]
    return np.nonzero(first)[0]


def grouped_mode(ds, key: str, vcol: str, num_parts: int = 64,
                 out_cols: tuple[str, str, str] = ("key", "mode", "n")):
    """Per-key most frequent value, tie-break = SMALLEST value.

    Combiner-first: per-block (key, value) counts → ONE hash exchange on
    the key → per-partition count merge + vectorized argmax (sort by
    (key, −count, value), first row per key run)."""
    from engine.rayds.shuffle import HASH_PARTS

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by([key, vcol]).aggregate([([], "count_all")])
        return g.rename_columns([key, vcol, "_c"])

    part = ds.map_batches(partial, batch_format="pyarrow", batch_size=None,
                          zero_copy_batch=True)

    def reduce_fn(group: pa.Table) -> pa.Table:
        g = group.group_by([key, vcol]).aggregate([("_c", "sum")])
        keys = _sortable(g[key].to_numpy(zero_copy_only=False))
        vals = _sortable(g[vcol].to_numpy(zero_copy_only=False))
        cnts = g["_c_sum"].to_numpy(zero_copy_only=False)
        order = np.lexsort((vals, -cnts, keys))
        take = order[_first_per_key_run(keys[order])]
        out = g.take(pa.array(take))
        return pa.table({
            out_cols[0]: out[key].combine_chunks(),
            out_cols[1]: out[vcol].combine_chunks(),
            out_cols[2]: out["_c_sum"].cast(pa.int64()).combine_chunks(),
        })

    from engine.rayds.shuffle import hash_exchange_groups

    return hash_exchange_groups(part, [key], reduce_fn, num_parts)


# ---------------------------------------------------------------------------
# contingency table + standardized residuals


def crosstab_residuals(ds, row_col: str, col_col: str):
    """Contingency table with expected counts and standardized
    residuals: per (row, col) observed count o, expected
    e = rt·ct/n (row/col totals), resid = (o−e)/√e.

    Scale shape: combiner-first counts (tree fold — a contingency
    table's cardinality is bounded by |rows|×|cols| BY DEFINITION, the
    operator's contract) collapse to ONE block where the marginals and
    the per-row float expressions are vectorized.  Every float is a
    per-row expression over exact integer aggregates in a fixed
    evaluation order — the SQL oracle mirrors it bit-for-bit (no
    order-dependent float SUM anywhere).
    """
    from engine.rayds.shuffle import grouped_agg

    counts = grouped_agg(
        ds.map_batches(
            lambda b: b.select([row_col, col_col]).append_column(
                "_one", pa.array(np.ones(b.num_rows, dtype=np.int64))),
            batch_format="pyarrow", batch_size=None, zero_copy_batch=True),
        [row_col, col_col], [("_one", "sum")], ["o"], plan="tree")

    def enrich(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        r = _sortable(batch[row_col].to_numpy(zero_copy_only=False))
        c = _sortable(batch[col_col].to_numpy(zero_copy_only=False))
        o = batch["o"].to_numpy(zero_copy_only=False).astype(np.int64)
        ru, ri = np.unique(r, return_inverse=True)
        cu, ci = np.unique(c, return_inverse=True)
        rt = np.bincount(ri, weights=o).astype(np.int64)[ri]
        ct = np.bincount(ci, weights=o).astype(np.int64)[ci]
        n = int(o.sum())
        # float-first product (CAST(rt AS DOUBLE)*ct in the oracle):
        # int64 rt*ct would overflow at ~1e12-row marginals
        e = (rt.astype(np.float64) * ct) / n
        resid = (o - e) / np.sqrt(e)
        return batch.append_column(
            "expected", pa.array(e)).append_column("resid", pa.array(resid))

    # grouped_agg's tree plan returns a single-block Dataset
    # (from_arrow), so the marginals see every row without a repartition
    return counts.map_batches(enrich, batch_format="pyarrow",
                              batch_size=None)


# ---------------------------------------------------------------------------
# latest-per-key compaction (streaming upsert)


def latest_by_key(ds, key: str, order_cols: list[str],
                  payload_cols: list[str], num_parts: int = 64):
    """ONE row per key: the row with the lexicographically LARGEST
    ``order_cols`` tuple (ints; ties broken by later order columns) —
    the streaming-upsert / CDC-compaction primitive.

    Per-block argmax keeps one row per key per block BEFORE the single
    hash exchange, so the all-to-all moves ≤ keys × blocks rows, never
    the raw stream.  Output columns: key + order_cols + payload_cols.
    """
    cols = [key] + order_cols + payload_cols

    def block_best(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.select(cols)
        keys = _sortable(batch[key].to_numpy(zero_copy_only=False))
        # datetime64 order columns: view as int64 (epoch ticks) so the
        # descending-sort negation works; order is preserved
        ords = [
            o.view(np.int64) if o.dtype.kind in "mM" else o
            for o in (batch[c].to_numpy(zero_copy_only=False)
                      for c in order_cols)
        ]
        # sort by (key, -order...) → first row of each key run is its max
        sortkeys = tuple(-o for o in reversed(ords)) + (keys,)
        order = np.lexsort(sortkeys)
        take = order[_first_per_key_run(keys[order])]
        return batch.select(cols).take(pa.array(take))

    best = ds.map_batches(block_best, batch_format="pyarrow",
                          batch_size=None, zero_copy_batch=True)
    def reduce_fn(group: pa.Table) -> pa.Table:
        return block_best(group.select(cols))

    from engine.rayds.shuffle import hash_exchange_groups

    return hash_exchange_groups(best, [key], reduce_fn, num_parts)


# ---------------------------------------------------------------------------
# per-group exact linear regression (regr_slope / regr_intercept / r)


def grouped_regression(ds, group_col: str, xcol: str, ycol: str,
                       xscale: int = 1, yscale: int = 1,
                       fold_width: int = 64) -> pa.Table:
    """Per-group least-squares fit y = slope·x + intercept plus Pearson
    r — the grouped ``regr_slope / regr_intercept / corr`` family —
    with ZERO shuffles: per-block per-group EXACT integer moment
    partials (decimal128) ride a raw-task tree fold that group-sums
    them (group cardinality is small by contract — a categorical
    column), and the driver computes the final doubles from exact
    integers in ONE FIXED EVALUATION ORDER mirrored by the SQL oracle:

      slope     = float(n·Σxy − Σx·Σy) / float(n·Σxx − Σx²)
      intercept = (float(Σy) − slope·float(Σx)) / float(n)
      r         = float(n·Σxy − Σx·Σy) /
                  (sqrt(float(n·Σxx − Σx²)) · sqrt(float(n·Σyy − Σy²)))

    Each float() is one rounding of an exact integer; ·, /, sqrt are
    correctly rounded IEEE ops — so the doubles are bit-identical to
    the oracle's (NOT DuckDB's built-in regr_*, which accumulates
    running floats)."""

    def partial(batch: pa.Table) -> pa.Table:
        cols = {group_col: pa.array([], type=batch.schema.field(group_col).type)}
        if batch.num_rows == 0:
            for c in _MOMENTS:
                cols[c] = pa.array([], type=DEC128)
            return pa.table(cols)
        import pyarrow.compute as pc

        g = batch[group_col].combine_chunks()
        enc = pc.dictionary_encode(g)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = enc.dictionary
        ng = len(vocab)
        x = _int_col(batch, xcol, xscale)
        y = _int_col(batch, ycol, yscale)
        mx = max(int(np.abs(x).max()), 1)
        my = max(int(np.abs(y).max()), 1)
        worst = max(mx * mx, my * my, mx * my)
        step = max(1, (1 << 62) // worst)
        n = len(x)
        # integer group sums via add.at per overflow-safe chunk (a
        # float-weighted bincount would NOT be exact), folded into
        # Python ints (arbitrary precision) across chunks
        acc = {c: np.zeros(ng, dtype=object) for c in _MOMENTS}
        for i in range(0, n, step):
            cs, xs, ys = codes[i:i + step], x[i:i + step], y[i:i + step]
            chunk = {"n": np.ones(len(cs), dtype=np.int64), "sx": xs,
                     "sy": ys, "sxx": xs * xs, "syy": ys * ys,
                     "sxy": xs * ys}
            for c, w in chunk.items():
                part = np.zeros(ng, dtype=np.int64)
                np.add.at(part, cs, w)
                acc[c] = acc[c] + part.astype(object)
        cols = {group_col: vocab}
        for c in _MOMENTS:
            cols[c] = pa.array([decimal.Decimal(int(v)) for v in acc[c]],
                               type=DEC128)
        return pa.table(cols)

    def fold(tbls: list[pa.Table]) -> pa.Table:
        t = pa.concat_tables(tbls, promote_options="permissive")
        if t.num_rows == 0:
            return tbls[0]
        gb = t.group_by([group_col]).aggregate(
            [(c, "sum") for c in _MOMENTS])
        return gb.rename_columns([group_col] + _MOMENTS)

    from engine.rayds.shuffle import tree_fold_refs

    part = ds.map_batches(partial, batch_format="pyarrow",
                          batch_size=None, zero_copy_batch=True)
    folded = tree_fold_refs(part, fold, width=fold_width)
    groups, slopes, inters, rs, ns = [], [], [], [], []
    for i in range(folded.num_rows):
        m = {c: int(folded[c][i].as_py()) for c in _MOMENTS}
        n, sx, sy, sxx, syy, sxy = (m[c] for c in _MOMENTS)
        num = float(n * sxy - sx * sy)
        vx = float(n * sxx - sx * sx)
        vy = float(n * syy - sy * sy)
        slope = num / vx if vx != 0.0 else float("nan")
        inter = ((float(sy) - slope * float(sx)) / float(n)
                 if n else float("nan"))
        r = (num / (math.sqrt(vx) * math.sqrt(vy))
             if vx > 0.0 and vy > 0.0 else float("nan"))
        groups.append(folded[group_col][i].as_py())
        ns.append(n)
        slopes.append(slope)
        inters.append(inter)
        rs.append(r)
    return pa.table({
        group_col: pa.array(groups,
                            type=folded.schema.field(group_col).type),
        "n": pa.array(ns, type=pa.int64()),
        "slope": pa.array(slopes, type=pa.float64()),
        "intercept": pa.array(inters, type=pa.float64()),
        "r": pa.array(rs, type=pa.float64()),
    })


# ---------------------------------------------------------------------------
# exact per-group z-score outliers (integer arithmetic end to end)


def grouped_zscore_outliers(ds, key: str, val_col: str, id_cols: list[str],
                            scale: int = 100, z: int = 3,
                            fold_width: int = 64):
    """Rows whose value lies more than ``z`` POPULATION standard
    deviations from their group's mean — decided EXACTLY in integer
    arithmetic (no float σ):

        flag ⟺ (n·x − Σy)² > z²·(n·Σyy − Σy²)

    evaluated as ``|n·x − Σy| > isqrt(z²·(n·Σyy − Σy²))`` — for integers
    d ≥ 0, d² > V ⟺ d > ⌊√V⌋, so the per-group threshold is ONE exact
    Python ``isqrt`` on the driver and the per-row test is a pure int64
    vector compare.  Assumes n·max|x| < 2⁶³ per group (10⁹ rows/group ×
    10⁷ cents holds comfortably); the moments themselves are exact at
    any scale (decimal128 partials).

    Plan: per-block per-group moment partials → raw-task tree fold
    (group cardinality ≪ rows by contract) → thresholds attach through
    the adaptive equi-join (broadcast while small, hash past the
    budget) → vectorized filter.  Returns a Dataset of the flagged
    rows' ``id_cols + [key, cents]``."""

    def partial(batch: pa.Table) -> pa.Table:
        kt = batch.schema.field(key).type
        if batch.num_rows == 0:
            return pa.table({key: pa.array([], type=kt),
                             "n": pa.array([], type=DEC128),
                             "sy": pa.array([], type=DEC128),
                             "syy": pa.array([], type=DEC128)})
        import pyarrow.compute as pc

        enc = pc.dictionary_encode(batch[key].combine_chunks())
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = enc.dictionary
        ng = len(vocab)
        y = _int_col(batch, val_col, scale)
        my = max(int(np.abs(y).max()), 1)
        step = max(1, (1 << 62) // (my * my))
        acc = {c: np.zeros(ng, dtype=object) for c in ("n", "sy", "syy")}
        for i in range(0, len(y), step):
            cs, ys = codes[i:i + step], y[i:i + step]
            for c, w in (("n", np.ones(len(cs), dtype=np.int64)),
                         ("sy", ys), ("syy", ys * ys)):
                part = np.zeros(ng, dtype=np.int64)
                np.add.at(part, cs, w)
                acc[c] = acc[c] + part.astype(object)
        cols = {key: vocab}
        for c in ("n", "sy", "syy"):
            cols[c] = pa.array([decimal.Decimal(int(v)) for v in acc[c]],
                               type=DEC128)
        return pa.table(cols)

    def fold(tbls: list[pa.Table]) -> pa.Table:
        t = pa.concat_tables(tbls, promote_options="permissive")
        if t.num_rows == 0:
            return tbls[0]
        gb = t.group_by([key]).aggregate(
            [(c, "sum") for c in ("n", "sy", "syy")])
        return gb.rename_columns([key, "n", "sy", "syy"])

    from engine.rayds.shuffle import equi_join, tree_fold_refs

    part = ds.map_batches(partial, batch_format="pyarrow",
                          batch_size=None, zero_copy_batch=True)
    folded = tree_fold_refs(part, fold, width=fold_width)
    keys_out, ns, sys_, thr = [], [], [], []
    for i in range(folded.num_rows):
        n = int(folded["n"][i].as_py())
        sy = int(folded["sy"][i].as_py())
        syy = int(folded["syy"][i].as_py())
        v = z * z * (n * syy - sy * sy)
        keys_out.append(folded[key][i].as_py())
        ns.append(n)
        sys_.append(sy)
        thr.append(math.isqrt(v) if v >= 0 else 0)
    import ray.data

    moments = ray.data.from_arrow(pa.table({
        key: pa.array(keys_out, type=folded.schema.field(key).type),
        "_n": pa.array(ns, type=pa.int64()),
        "_sy": pa.array(sys_, type=pa.int64()),
        "_thr": pa.array(thr, type=pa.int64()),
    }))

    def to_cents(batch: pa.Table) -> pa.Table:
        cols = {c: batch[c] for c in id_cols}
        cols[key] = batch[key]
        cols["cents"] = pa.array(_int_col(batch, val_col, scale))
        return pa.table(cols)

    ev = ds.map_batches(to_cents, batch_format="pyarrow",
                        batch_size=None, zero_copy_batch=True)
    joined = equi_join(moments, ev, key, key,
                       ["_n", "_sy", "_thr"], id_cols + ["cents"])

    def flag(batch: pa.Table) -> pa.Table:
        d = np.abs(batch["_n"].to_numpy(zero_copy_only=False)
                   * batch["cents"].to_numpy(zero_copy_only=False)
                   - batch["_sy"].to_numpy(zero_copy_only=False))
        keep = d > batch["_thr"].to_numpy(zero_copy_only=False)
        out = batch.filter(pa.array(keep))
        # the join's canonical key column is "_k" — rebadge to the key
        out = out.rename_columns(
            [key if c == "_k" else c for c in out.column_names])
        return out.select([key] + id_cols + ["cents"])

    return joined.map_batches(flag, batch_format="pyarrow",
                              batch_size=None)
