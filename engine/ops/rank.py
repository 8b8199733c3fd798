"""Distributed EXACT value ranking over a (possibly huge) column.

The shared scale shape: combiner-first DISTINCT-value counts (movement
bounded by the discretized domain, not rows) → ONE Ray range sort of
the distinct table → the two-phase prefix-sum scan (engine/ops/scan.py
— 3 ints per block to the driver) gives every distinct value its
EXCLUSIVE cumulative count cum0 = |{v' < v}|.  From (cum0, cnt) every
classical rank statistic falls out exactly:

- average-tie rank (×2 to stay integer): r2 = 2·cum0 + cnt + 1
  (Spearman, Kruskal–Wallis, Mann–Whitney)
- position-sum of a value's run: cnt·cum0 + cnt(cnt+1)/2 (Gini, CRPS)

Used by the spearman_corr / rank_sums / gini queries."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def distinct_counts_ranked(ds, col: str):
    """Dataset → Dataset (col, cnt, _cum0) over distinct values, sorted
    by ``col`` with block-disjoint ranges (materialized: the scan's two
    passes need stable block boundaries)."""
    from engine.ops.scan import ordered_cumsum
    from engine.rayds.shuffle import grouped_agg

    ones = ds.map_batches(
        lambda t: pa.table({
            col: t[col],
            "_one": pa.array(np.ones(t.num_rows, dtype=np.int64))}),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    counts = grouped_agg(ones, [col], [("_one", "sum")], ["cnt"])
    return ordered_cumsum(counts.sort(col).materialize(), col, "cnt",
                          out_col="_cum0")


def doubled_rank_map(ds, col: str, out_col: str):
    """Dataset → rank-map Dataset (col, out_col) where out_col is the
    DOUBLED average-tie rank (exact int64): 2·|{<v}| + cnt(v) + 1."""
    ranked = distinct_counts_ranked(ds, col)
    return ranked.map_batches(
        lambda t: pa.table({
            col: t[col],
            out_col: pa.array(2 * t["_cum0"].to_numpy()
                              + t["cnt"].to_numpy() + 1)}),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
