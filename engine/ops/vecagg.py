"""Grouped aggregation over VECTOR (list<float>) columns.

Training-data-pipeline operator: per-label centroids of an embedding
column — the class-prototype / cluster-stat primitive.  Pinned by the
DuckDB unnest oracle in ``__ray_entry__.oracle_sql``.

100-TB posture: ZERO shuffles — a (label, dim) partial-sum matrix is
tiny (|labels|·dim rows) regardless of corpus size, so per-block
partials ride the raw-task tree fold and the means are computed once on
the driver.  The per-block kernel works on the ListArray's FLAT values
buffer (zero-copy) with one ``np.add.at`` over a (label_code·dim + dim_idx)
composite — no per-row or per-vector Python.

Exactness: inputs quantize to integer micro-units (round(v·10⁶), exact
same rounding as the SQL oracle's ``round(CAST(x AS DOUBLE)·1000000)``
since float32→float64 widening is exact), sums are exact int64
(decimal128 past 2⁶² per block is unreachable: 10⁹ rows · 10⁶ micro ≤
10¹⁵), and the mean is ONE float division of exact integers.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa


def grouped_vector_mean(ds, label_col: str, vec_col: str,
                        fold_width: int = 64) -> pa.Table:
    """(label, dim, s, n, mean_micro) per label and vector position."""

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({
                "label": pa.array([], type=pa.int64()),
                "dim": pa.array([], type=pa.int64()),
                "s": pa.array([], type=pa.int64()),
                "n": pa.array([], type=pa.int64())})
        import pyarrow.compute as pc

        vec = batch[vec_col]
        if isinstance(vec, pa.ChunkedArray):
            vec = vec.combine_chunks()
        lens = pc.list_value_length(vec).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(vec)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        mv = np.rint(flat.to_numpy(zero_copy_only=False)
                     .astype(np.float64) * 1e6).astype(np.int64)
        labels = batch[label_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        uniq, codes = np.unique(labels, return_inverse=True)
        d = int(lens.max())
        if not (lens == d).all():
            raise ValueError("ragged embedding column")
        nl = len(uniq)
        comp = (np.repeat(codes, lens) * d
                + np.tile(np.arange(d, dtype=np.int64), len(labels)))
        sums = np.zeros(nl * d, dtype=np.int64)
        np.add.at(sums, comp, mv)
        cnt = np.repeat(np.bincount(codes, minlength=nl), d) \
            .astype(np.int64)
        return pa.table({
            "label": pa.array(np.repeat(uniq, d)),
            "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), nl)),
            "s": pa.array(sums),
            "n": pa.array(cnt)})

    def fold(tbls: list[pa.Table]) -> pa.Table:
        t = pa.concat_tables(tbls, promote_options="permissive")
        if t.num_rows == 0:
            return tbls[0]
        gb = t.group_by(["label", "dim"]).aggregate(
            [("s", "sum"), ("n", "sum")])
        return gb.rename_columns(["label", "dim", "s", "n"])

    from engine.rayds.shuffle import tree_fold_refs

    part = ds.map_batches(partial, batch_format="pyarrow",
                          batch_size=None, zero_copy_batch=True)
    folded = tree_fold_refs(part, fold, width=fold_width)
    s = folded["s"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = folded["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.table({
        "label": folded["label"],
        "dim": folded["dim"],
        "s": folded["s"],
        "n": folded["n"],
        "mean_micro": pa.array(s.astype(np.float64)
                               / n.astype(np.float64)),
    })


def vector_dim_stats(ds, vec_col: str, fold_width: int = 64) -> pa.Table:
    """GLOBAL per-dimension feature stats of an embedding column —
    (dim, n, mean_micro, var_micro2) — the normalization-statistics op
    (feature scaling / whitening prep).  ZERO shuffles: per-block
    per-dim EXACT integer micro-unit moment partials (Σmv int64 per
    block via overflow-safe chunked add.at, emitted as decimal128 so
    the fold is exact at any row count) ride the raw-task tree fold;
    the driver computes the doubles in ONE fixed evaluation order —
    mean = float(Σmv)/float(n), var = float(n·Σmv² − (Σmv)²)/float(n²)
    — bit-identical to the SQL oracle's HUGEINT→DOUBLE casts."""
    import decimal

    DEC = pa.decimal128(38, 0)

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"dim": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=DEC),
                             "s": pa.array([], type=DEC),
                             "ss": pa.array([], type=DEC)})
        import pyarrow.compute as pc

        vec = batch[vec_col]
        if isinstance(vec, pa.ChunkedArray):
            vec = vec.combine_chunks()
        lens = pc.list_value_length(vec).to_numpy(zero_copy_only=False)
        d = int(lens.max())
        if not (lens == d).all():
            raise ValueError("ragged embedding column")
        flat = pc.list_flatten(vec)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        mv = np.rint(flat.to_numpy(zero_copy_only=False)
                     .astype(np.float64) * 1e6).astype(np.int64)
        dims = np.tile(np.arange(d, dtype=np.int64), batch.num_rows)
        worst = max(int(np.abs(mv).max()) ** 2, 1)
        step = max(1, (1 << 62) // worst)
        s_acc = np.zeros(d, dtype=object)
        ss_acc = np.zeros(d, dtype=object)
        for i in range(0, len(mv), step):
            m, dd = mv[i:i + step], dims[i:i + step]
            p = np.zeros(d, dtype=np.int64)
            np.add.at(p, dd, m)
            s_acc = s_acc + p.astype(object)
            p = np.zeros(d, dtype=np.int64)
            np.add.at(p, dd, m * m)
            ss_acc = ss_acc + p.astype(object)
        n = int(batch.num_rows)
        return pa.table({
            "dim": pa.array(np.arange(d, dtype=np.int64)),
            "n": pa.array([decimal.Decimal(n)] * d, type=DEC),
            "s": pa.array([decimal.Decimal(int(v)) for v in s_acc],
                          type=DEC),
            "ss": pa.array([decimal.Decimal(int(v)) for v in ss_acc],
                           type=DEC)})

    def fold(tbls: list[pa.Table]) -> pa.Table:
        t = pa.concat_tables(tbls, promote_options="permissive")
        if t.num_rows == 0:
            return tbls[0]
        gb = t.group_by(["dim"]).aggregate(
            [("n", "sum"), ("s", "sum"), ("ss", "sum")])
        return gb.rename_columns(["dim", "n", "s", "ss"])

    from engine.rayds.shuffle import tree_fold_refs

    part = ds.map_batches(partial, batch_format="pyarrow",
                          batch_size=None, zero_copy_batch=True)
    folded = tree_fold_refs(part, fold, width=fold_width)
    dims, ns, means, vars_ = [], [], [], []
    for i in range(folded.num_rows):
        n = int(folded["n"][i].as_py())
        s = int(folded["s"][i].as_py())
        ss = int(folded["ss"][i].as_py())
        dims.append(int(folded["dim"][i].as_py()))
        ns.append(n)
        means.append(float(s) / float(n) if n else float("nan"))
        vars_.append(float(n * ss - s * s) / float(n * n)
                     if n else float("nan"))
    order = np.argsort(np.asarray(dims))
    return pa.table({
        "dim": pa.array(np.asarray(dims, dtype=np.int64)[order]),
        "n": pa.array(np.asarray(ns, dtype=np.int64)[order]),
        "mean_micro": pa.array(np.asarray(means)[order],
                               type=pa.float64()),
        "var_micro2": pa.array(np.asarray(vars_)[order],
                               type=pa.float64())})
