"""Distributed graph connectivity — the canonical dedup follow-up.

``connected_components(edges)`` turns a candidate-pair table (a, b)
into (node, cluster_id = min node id of the component) via iterative
HASH-MIN label propagation with POINTER JUMPING:

- round: every node proposes its label to every neighbour AND, via a
  map-side-derived pointer edge (x → label(x)), the pointer-jumping
  proposal label(label(x)) reaches x through the SAME single equi-join
  — collapsing chains in O(log diameter) rounds at 2 exchanges per
  round (one join, one min-aggregate).
- labels only ever DECREASE, so the fixpoint test is one distributed
  int64 sum per round (equal sum ⇒ no label moved ⇒ converged).

Scale shape per round: 1 hash-join exchange + 1 min-agg exchange over
the (node, label) table — all narrow int64 pairs; the edge list is
materialized once and reused every round.  Nothing lands on the driver
except the per-block partial sums (one int64 per block).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _label_sum(labels) -> int:
    def partial(batch: pa.Table) -> pa.Table:
        v = batch["lab"].to_numpy()
        return pa.table({"s": pa.array([int(v.sum())], type=pa.int64())})

    rows = labels.map_batches(
        partial, batch_format="pyarrow", batch_size=None
    ).take_all()
    return sum(int(r["s"]) for r in rows)


def _cc_local(tbl: pa.Table) -> pa.Table:
    """In-task vectorized CC (hash-min + pointer jumping over numpy
    index arrays) — the small-graph plan, run as ONE Ray task."""
    a = tbl["a"].to_numpy()
    b = tbl["b"].to_numpy()
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    ia, ib = inv[: len(a)], inv[len(a):]
    lab = np.arange(len(nodes), dtype=np.int64)
    while True:
        old = lab.copy()
        np.minimum.at(lab, ia, lab[ib])
        np.minimum.at(lab, ib, lab[ia])
        lab = lab[lab]
        if np.array_equal(lab, old):
            break
    return pa.table({"doc_id": pa.array(nodes), "cluster_id": pa.array(nodes[lab])})


SMALL_GRAPH_ROWS = 1_000_000  # edge budget for the single-task plan


def connected_components(edges, max_rounds: int = 30,
                         small_graph_rows: int = SMALL_GRAPH_ROWS):
    """(a, b) edge Dataset → (node, cluster_id) Dataset.

    ``cluster_id`` is the minimum node id of the component.  Isolated
    nodes (absent from the edge list) are not emitted — callers union
    them back if needed.

    Adaptive: an edge list within ``small_graph_rows`` solves in ONE
    vectorized task (dedup candidate graphs are tiny relative to the
    corpus); beyond it, the iterative distributed rounds below take
    over.  Both plans are equivalence-tested."""
    from engine.rayds.shuffle import hash_equi_join, hash_shuffle_agg

    edges = edges.select_columns(["a", "b"]).materialize()
    if edges.count() == 0:
        import ray.data

        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array([], type=pa.int64()),
            "cluster_id": pa.array([], type=pa.int64()),
        }))
    if edges.count() <= small_graph_rows:
        return edges.repartition(1).map_batches(
            _cc_local, batch_format="pyarrow", batch_size=None
        )

    def bidir(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy()
        b = batch["b"].to_numpy()
        return pa.table(
            {
                "node": pa.array(np.concatenate([a, b])),
                "nbr": pa.array(np.concatenate([b, a])),
            }
        )

    msgs = edges.map_batches(
        bidir, batch_format="pyarrow", batch_size=None
    ).materialize()

    def self_label(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch["node"], "lab": batch["node"]})

    labels = hash_shuffle_agg(
        msgs.map_batches(self_label, batch_format="pyarrow", batch_size=None),
        ["node"], [("lab", "min")], ["lab"],
    ).materialize()

    def pick(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["node"], "lab": t["lab"]})

    def ptr_edges(t: pa.Table) -> pa.Table:
        # (x, lab(x)) as a directed edge: joining labels onto it delivers
        # lab(lab(x)) to x — pointer jumping WITHOUT a second join
        # exchange (the edge derivation is a map over labels).
        return pa.table({"node": t["node"], "nbr": t["lab"]})

    prev = _label_sum(labels)
    for _ in range(max_rounds):
        targets = msgs.union(
            labels.map_batches(ptr_edges, batch_format="pyarrow", batch_size=None)
        )
        # one join delivers label(x) to every neighbour AND label(label(x))
        # to x; one min-agg exchange folds the proposals
        m = hash_equi_join(labels, targets, "node", "nbr", ["lab"], ["node"])
        cand = labels.union(
            m.map_batches(pick, batch_format="pyarrow", batch_size=None)
        )
        labels = hash_shuffle_agg(
            cand, ["node"], [("lab", "min")], ["lab"]
        ).materialize()
        cur = _label_sum(labels)
        if cur == prev:
            break
        prev = cur

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(["doc_id", "cluster_id"])

    return labels.map_batches(rename, batch_format="pyarrow", batch_size=None)
