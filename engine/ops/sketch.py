"""Mergeable sketches + exact distinct-count plans.

- ``distinct_count_exact``: per-group COUNT(DISTINCT value) with the
  combiner-first shape — per-block dedup of (group, value) pairs (the
  narrow combiner), ONE hash exchange on the group key, per-partition
  exact distinct count.  Matches SQL exactly (the ★ oracle path).
- ``hll_sketch`` / ``hll_merge`` / ``hll_count``: HyperLogLog with
  2^P registers — the fixed-memory scale path when per-group value
  cardinality is too large to exchange even deduped pairs.  Registers
  are np.maximum-mergeable across blocks/partitions, so the whole
  reduction is a tree of tiny fixed-size arrays regardless of input
  size.  Error ≈ 1.04/sqrt(2^P) (~1.6% at P=12).

No external sketch library: plain numpy over 64-bit mixed hashes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

HLL_P = 12  # 4096 registers, ~1.6% standard error
_HLL_M = 1 << HLL_P
_MIX1 = np.uint64(0xFF51AFD7ED558CCD)
_MIX2 = np.uint64(0xC4CEB9FE1A85EC53)


def _mix64(h: np.ndarray) -> np.ndarray:
    h = h.astype(np.uint64).copy()
    h ^= h >> np.uint64(33)
    h *= _MIX1
    h ^= h >> np.uint64(29)
    h *= _MIX2
    h ^= h >> np.uint64(32)
    return h


def _hash_any(values) -> np.ndarray:
    """uint64 hash of an int/string numpy-ish column."""
    v = np.asarray(values)
    if v.dtype.kind in "iu":
        return _mix64(v.astype(np.uint64))
    # strings/objects: stable per-value 64-bit FNV over utf-8 bytes
    out = np.empty(len(v), dtype=np.uint64)
    for i, s in enumerate(v):
        h = np.uint64(0xCBF29CE484222325)
        for b in str(s).encode():
            h = (h ^ np.uint64(b)) * np.uint64(0x100000001B3)
        out[i] = h
    return _mix64(out)


def hll_sketch(values) -> np.ndarray:
    """(n,) values → (2^P,) uint8 register array (rank-of-first-one)."""
    h = _hash_any(values)
    reg = np.zeros(_HLL_M, dtype=np.uint8)
    if len(h) == 0:
        return reg
    idx = (h >> np.uint64(64 - HLL_P)).astype(np.int64)
    rest = (h << np.uint64(HLL_P)) | np.uint64((1 << HLL_P) - 1)
    # rank = leading zeros of `rest` + 1, vectorized via bit length
    lz = np.zeros(len(h), dtype=np.uint8)
    x = rest.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        mask = x < (np.uint64(1) << np.uint64(64 - shift))
        lz[mask] += np.uint8(shift)
        x[mask] <<= np.uint64(shift)
    rank = lz + 1
    np.maximum.at(reg, idx, rank)
    return reg


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def hll_count(reg: np.ndarray) -> float:
    """Standard HLL estimate with small-range (linear counting) and
    large-range corrections."""
    m = float(_HLL_M)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.float64(2.0) ** -reg.astype(np.float64))
    zeros = int(np.count_nonzero(reg == 0))
    if est <= 2.5 * m and zeros:
        return m * np.log(m / zeros)
    if est > (1 << 32) / 30.0:
        return -(1 << 32) * np.log(1.0 - est / (1 << 32))
    return float(est)


def hll_distinct(ds, col: str) -> float:
    """Approximate global COUNT(DISTINCT col): per-block fixed-size
    register partials, np.maximum tree-merge on the driver (each partial
    is 4 KB — driver cost bounded by block count, never rows)."""

    def partial(batch: pa.Table) -> pa.Table:
        reg = hll_sketch(batch[col].to_numpy(zero_copy_only=False))
        return pa.table({"reg": pa.array([reg.tobytes()], type=pa.binary())})

    rows = ds.select_columns([col]).map_batches(
        partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).take_all()
    acc = np.zeros(_HLL_M, dtype=np.uint8)
    for r in rows:
        acc = hll_merge(acc, np.frombuffer(r["reg"], dtype=np.uint8))
    return hll_count(acc)


def distinct_count_exact(ds, group_col: str, val_col: str,
                         out_col: str = "n_distinct", num_parts: int = 64):
    """Per-group exact COUNT(DISTINCT val): per-block (group, val) dedup
    combiner → one hash exchange on the group key → per-partition
    pyarrow group_by distinct count.  Exchange volume is the deduped
    pair count, not the row count."""
    def dedup_block(batch: pa.Table) -> pa.Table:
        return batch.select([group_col, val_col]).group_by(
            [group_col, val_col]
        ).aggregate([])

    def merge(group: pa.Table) -> pa.Table:
        t = group.drop_columns(["_part"]).group_by(
            [group_col, val_col]
        ).aggregate([])
        t = t.group_by([group_col]).aggregate([(val_col, "count")])
        return t.rename_columns([group_col, out_col])

    deduped = ds.select_columns([group_col, val_col]).map_batches(
        dedup_block, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True,
    )
    from engine.rayds.shuffle import hash_exchange_groups

    return hash_exchange_groups(deduped, [group_col], merge, num_parts)


def grouped_quantiles(ds, group_col: str, val_col: str,
                      qs=(0.25, 0.5, 0.75, 0.95), num_parts: int = 64):
    """Per-group EXACT discrete quantiles over an integer-valued column
    by distributed counting: per-block (group, value) count combiner →
    one hash exchange on the group key → per-partition sort + cumsum +
    rank pick (rank = ceil(q·n), 1-indexed — SQL ``quantile_disc``
    semantics).  Exchange volume is the distinct (group, value) pair
    count — bounded by the value domain, not the row count, which is
    what makes exact quantiles feasible at 100 TB on discretized
    columns (cents, ms latencies, token counts…).

    Output: one row per (group, q): (group_col, q, val_col)."""
    qs = list(qs)

    def count_block(batch: pa.Table) -> pa.Table:
        t = batch.select([group_col, val_col]).group_by(
            [group_col, val_col]
        ).aggregate([([], "count_all")])
        return t.rename_columns([group_col, val_col, "_cnt"])

    def merge(group: pa.Table) -> pa.Table:
        t = group.drop_columns(["_part"]).group_by(
            [group_col, val_col]
        ).aggregate([("_cnt", "sum")])
        t = t.rename_columns([group_col, val_col, "_cnt"])
        g = t[group_col].to_numpy(zero_copy_only=False)
        v = t[val_col].to_numpy()
        c = t["_cnt"].to_numpy()
        order = np.lexsort((v, g))
        g, v, c = g[order], v[order], c[order]
        new_g = np.ones(len(g), dtype=bool)
        if len(g):
            new_g[1:] = g[1:] != g[:-1]
        starts = np.nonzero(new_g)[0]
        out_g, out_q, out_v = [], [], []
        for si, s in enumerate(starts):
            e = starts[si + 1] if si + 1 < len(starts) else len(g)
            cum = np.cumsum(c[s:e])
            n = cum[-1]
            for q in qs:
                rank = int(np.ceil(q * n - 1e-9))
                rank = max(1, min(rank, int(n)))
                idx = int(np.searchsorted(cum, rank, side="left"))
                out_g.append(g[s])
                out_q.append(q)
                out_v.append(v[s + idx])
        return pa.table({
            group_col: pa.array(out_g, type=t[group_col].type),
            "q": pa.array(out_q, type=pa.float64()),
            val_col: pa.array(np.asarray(out_v, dtype=np.int64)),
        })

    counted = ds.select_columns([group_col, val_col]).map_batches(
        count_block, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True,
    )
    from engine.rayds.shuffle import hash_exchange_groups

    return hash_exchange_groups(counted, [group_col], merge, num_parts)


def grouped_quantiles_cont(ds, group_col: str, val_col: str,
                           qs=(0.25, 0.5, 0.75), num_parts: int = 64):
    """Per-group EXACT INTERPOLATED quantiles — bit-identical to SQL
    ``quantile_cont`` per group: h = (n−1)·q, lower·(1−frac) +
    upper·frac in that exact double expression order.

    Same counting decomposition as :func:`grouped_quantiles` (per-block
    (group, value) count combiner → one hash exchange on the group key
    → per-partition cumsum rank picks); the exchange volume is the
    DISTINCT (group, value) pair count — tight for discretized domains,
    degrades to the row count for continuous doubles (where the MRL
    sketch is the approximate scale path).

    Output: one row per (group, q): (group_col, q, val_col:float64)."""
    qs = list(qs)

    def count_block(batch: pa.Table) -> pa.Table:
        t = batch.select([group_col, val_col]).group_by(
            [group_col, val_col]
        ).aggregate([([], "count_all")])
        return t.rename_columns([group_col, val_col, "_cnt"])

    def merge(group: pa.Table) -> pa.Table:
        t = group.drop_columns(["_part"]).group_by(
            [group_col, val_col]
        ).aggregate([("_cnt", "sum")])
        t = t.rename_columns([group_col, val_col, "_cnt"])
        g = t[group_col].to_numpy(zero_copy_only=False)
        v = t[val_col].to_numpy(zero_copy_only=False).astype(np.float64)
        c = t["_cnt"].to_numpy()
        order = np.lexsort((v, g))
        g, v, c = g[order], v[order], c[order]
        new_g = np.ones(len(g), dtype=bool)
        if len(g):
            new_g[1:] = g[1:] != g[:-1]
        starts = np.nonzero(new_g)[0]
        out_g, out_q, out_v = [], [], []
        for si, s in enumerate(starts):
            e = starts[si + 1] if si + 1 < len(starts) else len(g)
            cum = np.cumsum(c[s:e])
            n = int(cum[-1])
            for q in qs:
                h = (n - 1) * q
                lo = int(np.floor(h))
                hi = int(np.ceil(h))
                frac = h - lo
                # 0-indexed rank r → first i with cum[i] ≥ r+1
                vlo = v[s + int(np.searchsorted(cum, lo + 1, side="left"))]
                vhi = v[s + int(np.searchsorted(cum, hi + 1, side="left"))]
                out_g.append(g[s])
                out_q.append(q)
                out_v.append(vlo * (1 - frac) + vhi * frac)
        return pa.table({
            group_col: pa.array(out_g, type=t[group_col].type),
            "q": pa.array(out_q, type=pa.float64()),
            val_col: pa.array(np.asarray(out_v, dtype=np.float64)),
        })

    counted = ds.select_columns([group_col, val_col]).map_batches(
        count_block, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True,
    )
    from engine.rayds.shuffle import hash_exchange_groups

    return hash_exchange_groups(counted, [group_col], merge, num_parts)


# ---------------------------------------------------------------------------
# Deterministic mergeable quantile summary (MRL / KLL-style, no RNG) —
# the CONTINUOUS-value scale path that complements grouped_quantiles
# (whose exchange is distinct (group, value) pairs — exact and right for
# discrete values, impossible for 10^12 distinct doubles).
#
# Structure: per level L a sorted buffer with item weight 2^L.  A level
# over budget compacts by keeping alternate items (per-level flip bit —
# deterministic, no worker RNG) and promoting them one level up.  Every
# compaction of a weight-w buffer perturbs any rank by at most w, so the
# sketch carries an EXACT self-certified error counter: quantile answers
# are guaranteed within ±err ranks, and tests/queries assert against it
# (same checkable-bound design as heavy_hitters).  Sketches serialize to
# (level, value) rows + (n, err) meta and merge associatively — the
# distributed shape is per-block partials → driver fold of tiny tables
# (k·levels items per block), NO all-to-all.

class MRLSketch:
    """Deterministic mergeable rank/quantile summary."""

    def __init__(self, k: int = 256):
        self.k = int(k)
        self.levels: dict[int, np.ndarray] = {}
        self.n = 0
        self.err = 0  # max rank error, maintained exactly
        self._flip: dict[int, int] = {}

    def insert(self, values: np.ndarray) -> "MRLSketch":
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return self
        self.n += len(v)
        base = self.levels.get(0)
        merged = np.sort(v) if base is None else np.concatenate([base, v])
        if base is not None:
            merged.sort()
        self.levels[0] = merged
        self._compact_all()
        return self

    def _compact_all(self) -> None:
        L = 0
        while L <= max(self.levels, default=0):
            buf = self.levels.get(L)
            if buf is not None and len(buf) > self.k:
                off = self._flip.get(L, 0)
                self._flip[L] = off ^ 1
                kept = buf[off::2]
                self.err += 1 << L  # compaction of weight-2^L buffer
                self.levels[L] = np.empty(0, dtype=np.float64)
                up = self.levels.get(L + 1)
                if up is None or len(up) == 0:
                    self.levels[L + 1] = kept
                else:
                    m = np.concatenate([up, kept])
                    m.sort()
                    self.levels[L + 1] = m
            L += 1

    def merge(self, other: "MRLSketch") -> "MRLSketch":
        for L, buf in other.levels.items():
            if len(buf) == 0:
                continue
            mine = self.levels.get(L)
            if mine is None or len(mine) == 0:
                self.levels[L] = buf.copy()
            else:
                m = np.concatenate([mine, buf])
                m.sort()
                self.levels[L] = m
        self.n += other.n
        self.err += other.err
        self._compact_all()
        return self

    def _items(self):
        vals, wts = [], []
        for L, buf in self.levels.items():
            if len(buf):
                vals.append(buf)
                wts.append(np.full(len(buf), 1 << L, dtype=np.int64))
        if not vals:
            return np.empty(0), np.empty(0, dtype=np.int64)
        v = np.concatenate(vals)
        w = np.concatenate(wts)
        o = np.argsort(v, kind="stable")
        return v[o], w[o]

    def quantile(self, qs) -> np.ndarray:
        """Values whose true rank is within ±err of q·n, per q."""
        v, w = self._items()
        if len(v) == 0:
            return np.full(len(np.atleast_1d(qs)), np.nan)
        cum = np.cumsum(w)
        target = np.atleast_1d(np.asarray(qs, dtype=np.float64)) * self.n
        idx = np.minimum(np.searchsorted(cum, target, side="left"), len(v) - 1)
        return v[idx]

    def to_table(self) -> pa.Table:
        """Serialize as (level, value) rows plus ONE meta sentinel row
        (_lvl = -1) carrying (n, err).  Concatenating serialized
        sketches therefore IS a valid combined serialization — sentinel
        n/err add up, per-level buffers concatenate — which is what lets
        ``from_table`` deserialize a whole repartitioned batch of block
        sketches in one shot (the tree-fold stage)."""
        v, levels = [], []
        for L, buf in self.levels.items():
            if len(buf):
                v.append(buf)
                levels.append(np.full(len(buf), L, dtype=np.int64))
        val = np.concatenate(v) if v else np.empty(0)
        lev = np.concatenate(levels) if levels else np.empty(0, dtype=np.int64)
        return pa.table({
            "_lvl": pa.array(np.concatenate([lev, [-1]])),
            "_val": pa.array(np.concatenate([val, [np.nan]])),
            "_meta": pa.array(
                np.concatenate([np.zeros(len(val), np.int64),
                                [self.n]]).astype(np.int64)),
            "_meta2": pa.array(
                np.concatenate([np.zeros(len(val), np.int64),
                                [self.err]]).astype(np.int64)),
        })

    @classmethod
    def from_table(cls, t: pa.Table, k: int = 256) -> "MRLSketch":
        """Deserialize one OR MANY concatenated serialized sketches
        (n/err fold over the sentinel rows; buffers merge per level,
        then compact)."""
        s = cls(k)
        if t.num_rows == 0:
            return s
        lev = t["_lvl"].to_numpy()
        val = t["_val"].to_numpy()
        meta = lev == -1
        s.n = int(t["_meta"].to_numpy()[meta].sum())
        s.err = int(t["_meta2"].to_numpy()[meta].sum())
        for L in np.unique(lev[~meta]):
            buf = np.sort(val[lev == L])
            s.levels[int(L)] = buf
        s._compact_all()
        return s


def mrl_quantiles(ds, col: str, qs, k: int = 256):
    """Approximate quantiles of a numeric column with a GUARANTEED rank
    bound: returns (values per q, n, err) — each value's true rank is
    within ±err of q·n.  Per-block sketch partials (≤ k·levels tiny
    rows each) fold on the driver; no exchange touches the data."""

    def partial(batch: pa.Table) -> pa.Table:
        s = MRLSketch(k).insert(batch[col].to_numpy(zero_copy_only=False))
        return s.to_table()

    parts = ds.select_columns([col]).map_batches(
        partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )

    # raw-task tree fold of the serialized block sketches — the driver
    # sees ONE sketch table regardless of input block count
    from engine.rayds.shuffle import tree_fold_refs

    final = tree_fold_refs(
        parts,
        lambda tbls: MRLSketch.from_table(pa.concat_tables(tbls),
                                          k).to_table())
    total = MRLSketch.from_table(final, k)
    return total.quantile(qs), total.n, total.err


def grouped_mrl_quantiles(ds, group_col: str, val_col: str, qs,
                          k: int = 256):
    """PER-GROUP approximate quantiles with certified rank bounds — the
    scale path ``grouped_quantiles_cont`` documents for continuous
    domains (where exact counting degrades to the row count).

    Plan: per block, one MRL sketch per group present in the block
    (serialized rows tagged with the group key — concatenated
    serializations stay valid, the property ``to_table`` guarantees);
    ONE hash exchange on the group key co-locates each group's block
    sketches; per key run ``from_table`` merges them and answers every
    q.  Exchange volume = groups × blocks × (k·levels) tiny rows —
    never the data.  Output: one row per group with the q-values plus
    the self-certified (n, err) rank bound.

    The per-block loop is over DISTINCT GROUPS in the block (not rows);
    the insert itself is vectorized."""

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({
                group_col: pa.array([], type=pa.string()),
                "_lvl": pa.array([], type=pa.int64()),
                "_val": pa.array([], type=pa.float64()),
                "_meta": pa.array([], type=pa.int64()),
                "_meta2": pa.array([], type=pa.int64())})
        keys = batch[group_col].to_numpy(zero_copy_only=False)
        vals = batch[val_col].to_numpy(zero_copy_only=False)
        order = np.argsort(keys, kind="stable")
        keys, vals = keys[order], vals[order]
        starts = np.ones(len(keys), dtype=bool)
        starts[1:] = keys[1:] != keys[:-1]
        idx = np.nonzero(starts)[0]
        ends = np.append(idx[1:], len(keys))
        tabs = []
        for s, e in zip(idx, ends):
            t = MRLSketch(k).insert(vals[s:e]).to_table()
            tabs.append(t.append_column(
                group_col, pa.array([keys[s]] * t.num_rows)))
        out = pa.concat_tables(tabs)
        return out.select([group_col, "_lvl", "_val", "_meta", "_meta2"])

    parts = ds.select_columns([group_col, val_col]).map_batches(
        partial, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True)

    qs_arr = np.atleast_1d(np.asarray(qs, dtype=np.float64))

    def per_group(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_part"]) if "_part" in group.column_names \
            else group
        if g.num_rows == 0:
            cols = {group_col: pa.array([], type=pa.string()),
                    "n": pa.array([], type=pa.int64()),
                    "err": pa.array([], type=pa.int64())}
            for q in qs_arr:
                cols[f"q{int(round(q * 100))}"] = pa.array(
                    [], type=pa.float64())
            return pa.table(cols)
        s = MRLSketch.from_table(
            g.select(["_lvl", "_val", "_meta", "_meta2"]), k)
        v = s.quantile(qs_arr)
        cols = {group_col: pa.array([g[group_col][0].as_py()]),
                "n": pa.array([s.n], type=pa.int64()),
                "err": pa.array([s.err], type=pa.int64())}
        for q, val in zip(qs_arr, v):
            cols[f"q{int(round(q * 100))}"] = pa.array(
                [float(val)], type=pa.float64())
        return pa.table(cols)

    from engine.rayds.shuffle import hash_exchange_fine_groups

    return hash_exchange_fine_groups(parts, [group_col], per_group)


def grouped_hll_distinct(ds, group_col: str, val_col: str):
    """Per-group approximate COUNT(DISTINCT val) — HLL register
    partials PER GROUP ride the raw-task tree fold (each partial is
    |groups in block| rows × 4 KB registers; group cardinality is
    small by contract — a categorical column), merged by elementwise
    np.maximum per key.  Returns a driver-side table
    (group, approx_distinct float)."""
    from engine.rayds.shuffle import tree_fold_refs

    def partial(batch: pa.Table) -> pa.Table:
        gtype = batch.schema.field(group_col).type
        if batch.num_rows == 0:
            return pa.table({group_col: pa.array([], type=gtype),
                             "reg": pa.array([], type=pa.binary())})
        g = batch[group_col].to_numpy(zero_copy_only=False)
        v = batch[val_col].to_numpy(zero_copy_only=False)
        keys, regs = [], []
        for k in np.unique(g):
            keys.append(k)
            regs.append(hll_sketch(v[g == k]).tobytes())
        return pa.table({group_col: pa.array(keys, type=gtype),
                         "reg": pa.array(regs, type=pa.binary())})

    def fold(tbls: list[pa.Table]) -> pa.Table:
        t = pa.concat_tables(tbls).combine_chunks()
        if t.num_rows == 0:
            return tbls[0]
        g = t[group_col].to_numpy(zero_copy_only=False)
        regs = t["reg"].to_pylist()
        keys, out = [], []
        for k in np.unique(g):
            acc = np.zeros(_HLL_M, dtype=np.uint8)
            for i in np.flatnonzero(g == k):
                acc = hll_merge(acc, np.frombuffer(regs[i],
                                                   dtype=np.uint8))
            keys.append(k)
            out.append(acc.tobytes())
        return pa.table({group_col: pa.array(
            keys, type=t.schema.field(group_col).type),
            "reg": pa.array(out, type=pa.binary())})

    folded = tree_fold_refs(
        ds.select_columns([group_col, val_col]).map_batches(
            partial, batch_format="pyarrow", batch_size=None,
            zero_copy_batch=True),
        fold)
    keys, est = [], []
    for i in range(folded.num_rows):
        keys.append(folded[group_col][i].as_py())
        est.append(hll_count(np.frombuffer(folded["reg"][i].as_py(),
                                           dtype=np.uint8)))
    return pa.table({group_col: pa.array(
        keys, type=folded.schema.field(group_col).type),
        "approx_distinct": pa.array(est, type=pa.float64())})


# ---------------------------------------------------------------------------
# count-min sketch (linear: partials SUM, so the tree fold is exact)

CM_D, CM_W = 4, 16384
_CM_SEEDS = np.array([0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F,
                      0x165667B19E3779F9, 0x27D4EB2F165667C5],
                     dtype=np.uint64)


def cm_sketch(hashes64: np.ndarray) -> np.ndarray:
    """(n,) uint64 pre-hashed keys → (CM_D, CM_W) int64 count matrix."""
    m = np.zeros((CM_D, CM_W), dtype=np.int64)
    if len(hashes64) == 0:
        return m
    for d in range(CM_D):
        idx = ((hashes64 * _CM_SEEDS[d]) >> np.uint64(50)).astype(
            np.int64) % CM_W
        np.add.at(m[d], idx, 1)
    return m


def cm_estimate(m: np.ndarray, hashes64: np.ndarray) -> np.ndarray:
    """Point estimates (upper bounds) for each queried key."""
    est = np.full(len(hashes64), np.iinfo(np.int64).max, dtype=np.int64)
    for d in range(CM_D):
        idx = ((hashes64 * _CM_SEEDS[d]) >> np.uint64(50)).astype(
            np.int64) % CM_W
        est = np.minimum(est, m[d][idx])
    return est


def cm_word_counts(ds, text_col: str = "text"):
    """COUNT-MIN word-frequency sketch over a corpus: per-block
    (CM_D × CM_W) partials SUM through the raw-task tree fold (the
    sketch is linear, so the merged sketch equals the single-pass
    sketch EXACTLY — partitioning cannot change an estimate), zero
    exchanges, 512 KiB driver state at any corpus size.  Returns the
    merged matrix plus the exact total token count."""
    import pyarrow.compute as pc

    from engine.rayds.shuffle import tree_fold_refs

    def partial(batch: pa.Table) -> pa.Table:
        words = pc.split_pattern(batch[text_col], " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        flat = pc.list_flatten(words)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        h = _hash_words(flat)
        m = cm_sketch(h)
        return pa.table({"m": pa.array([m.tobytes()], type=pa.binary()),
                         "n": pa.array([len(h)], type=pa.int64())})

    def fold(tbls: list[pa.Table]) -> pa.Table:
        t = pa.concat_tables(tbls).combine_chunks()
        if t.num_rows == 0:
            return tbls[0]
        acc = np.zeros((CM_D, CM_W), dtype=np.int64)
        for b in t["m"].to_pylist():
            acc += np.frombuffer(b, dtype=np.int64).reshape(CM_D, CM_W)
        n = int(pa.compute.sum(t["n"]).as_py())
        return pa.table({"m": pa.array([acc.tobytes()],
                                       type=pa.binary()),
                         "n": pa.array([n], type=pa.int64())})

    folded = tree_fold_refs(
        ds.select_columns([text_col]).map_batches(
            partial, batch_format="pyarrow", batch_size=None,
            zero_copy_batch=True),
        fold)
    m = np.frombuffer(folded["m"][0].as_py(), dtype=np.int64).reshape(
        CM_D, CM_W)
    return m, int(folded["n"][0].as_py())


def _hash_words(flat: pa.Array) -> np.ndarray:
    """Vectorized FNV-1a 64-bit over the flat UTF-8 buffer of a string
    array — one pass over the bytes via offset-sliced accumulation (no
    per-word Python)."""
    n = len(flat)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    buf = np.frombuffer(flat.buffers()[2], dtype=np.uint8)
    raw = np.frombuffer(flat.buffers()[1], dtype=np.int32)
    # keep offsets ABSOLUTE into the full data buffer (sliced arrays
    # start mid-buffer)
    offs = raw[flat.offset:flat.offset + n + 1].astype(np.int64)
    h = np.full(n, 0xCBF29CE484222325, dtype=np.uint64)
    lens = offs[1:] - offs[:-1]
    maxlen = int(lens.max()) if n else 0
    prime = np.uint64(0x100000001B3)
    for k in range(maxlen):
        alive = lens > k
        idx = offs[:-1][alive] + k
        h[alive] = (h[alive] ^ buf[idx].astype(np.uint64)) * prime
    return h
