"""Distributed graph connectivity — the canonical dedup follow-up.

``connected_components(edges)`` turns a candidate-pair table (a, b)
into (node, cluster_id = min node id of the component).

Two plans:

- **small-graph** (edge count within ``small_graph_rows``): ONE
  vectorized numpy task — dedup candidate graphs are tiny relative to
  the corpus, so this is the common case.
- **BSP** (beyond the budget): iterative HASH-MIN label propagation
  with POINTER JUMPING as a bulk-synchronous-parallel round loop over
  RAW RAY TASKS on a static hash partitioning of the node space.  This
  is the one place the Dataset API genuinely can't express the
  semantics: an O(log diameter) iteration over shared mutable label
  state.  A Dataset realization (per-round hash-join + min-agg
  pipelines) was measured at 2–6 s of fixed executor overhead PER
  ROUND with geometric block-count growth across rounds — the BSP
  rounds below are pure numpy + P-way object exchanges and run in
  milliseconds at the same scale.

  Round structure (labels only ever DECREASE, so every step is safe to
  reorder and the fixpoint is the component min — standard hash-min
  argument):

  - wave A *propose*: partition p emits, per destination partition,
    neighbour proposals ``(nbr, lab[x])`` routed by hash(nbr) and
    pointer queries ``(lab[x], x)`` routed by hash(lab[x]).
  - wave B *answer+apply*: partition p answers each query ``(y, x)``
    with a reply ``(x, lab[y])`` — delivering lab(lab(x)) to x, the
    pointer jump — then folds the incoming proposals with a
    vectorized ``np.minimum.at``.
  - wave C *apply replies*: fold replies the same way; return the
    per-partition changed-count (one int to the driver).

  Exchange volume per round: 2·E proposal entries + 2·N query/reply
  entries, all narrow int64 numpy arrays moved partition-to-partition
  through the object store (P² small objects, never the driver).
  Convergence: stop when no label moved (≈ log2(diameter) + 2 rounds).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

SMALL_GRAPH_ROWS = 1_000_000  # edge budget for the single-task plan
BSP_PARTS = 32  # static node-space partitions of the BSP plan


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


def _part_of(node: np.ndarray, num_parts: int) -> np.ndarray:
    """Partition id per node — same avalanche mix as shuffle._col_hash
    (int path) so partitioning is deterministic and well spread even on
    contiguous ids."""
    h = node.astype(np.int64).view(np.uint64).copy()
    h ^= h >> np.uint64(33)
    h *= np.uint64(0xFF51AFD7ED558CCD)
    h ^= h >> np.uint64(29)
    return (h % np.uint64(num_parts)).astype(np.int64)


def _route(dest: np.ndarray, num_parts: int, *payloads: np.ndarray):
    """Split payload arrays by destination partition → list of tuples
    (one per partition) of the payload slices."""
    part = _part_of(dest, num_parts)
    order = np.argsort(part, kind="stable")
    bounds = np.searchsorted(part[order], np.arange(num_parts + 1))
    cols = [p[order] for p in payloads]
    return [
        tuple(c[bounds[i]: bounds[i + 1]] for c in cols)
        for i in range(num_parts)
    ]


def _bsp_remotes():
    """Late-bound ray.remote task definitions (keeps module import free
    of a ray dependency for pure-geo users)."""
    import ray

    @ray.remote
    def shard_edges(block: pa.Table, num_parts: int):
        # bidirectional edges routed by hash(src): partition p ends up
        # owning every edge whose SOURCE lives in p.
        a = block["a"].to_numpy()
        b = block["b"].to_numpy()
        src = np.concatenate([a, b])
        dst = np.concatenate([b, a])
        return tuple(_route(src, num_parts, src, dst))

    @ray.remote
    def build_part(*bundles):
        # STATIC per-partition topology, stored in plasma ONCE — rounds
        # only re-store the (narrow) label array.
        srcs = [x[0] for x in bundles if x is not None and len(x[0])]
        dsts = [x[1] for x in bundles if x is not None and len(x[1])]
        src = np.concatenate(srcs) if srcs else np.empty(0, np.int64)
        dst = np.concatenate(dsts) if dsts else np.empty(0, np.int64)
        nodes, esrc = np.unique(src, return_inverse=True)
        return {"nodes": nodes, "esrc": esrc, "edst": dst}, nodes.copy()

    @ray.remote
    def propose(static, lab, num_parts: int):
        # neighbour proposals (dest node, proposed label)
        pn, pl = static["edst"], lab[static["esrc"]]
        # pointer queries: ask hash(lab[x]) for lab[lab[x]], reply to x
        qy, qx = lab, static["nodes"]
        props = _route(pn, num_parts, pn, pl)
        qrys = _route(qy, num_parts, qy, qx)
        return tuple(
            (props[i][0], props[i][1], qrys[i][0], qrys[i][1])
            for i in range(num_parts)
        )

    @ray.remote
    def answer_apply(static, lab, num_parts: int, *msgs):
        nodes = static["nodes"]
        pn = np.concatenate([m[0] for m in msgs])
        pl = np.concatenate([m[1] for m in msgs])
        qy = np.concatenate([m[2] for m in msgs])
        qx = np.concatenate([m[3] for m in msgs])
        # answers use the PRE-apply labels (any order is correct: labels
        # are monotone decreasing and the fixpoint is order-free)
        ry = lab[np.searchsorted(nodes, qy)]
        replies = _route(qx, num_parts, qx, ry)
        new = lab.copy()
        if len(pn):
            np.minimum.at(new, np.searchsorted(nodes, pn), pl)
        changed = int((new != lab).sum())
        # P reply bundles as SEPARATE returns (so partition p can pull
        # only its own bundle), then the new labels, then changed count
        return tuple(replies) + (new, changed)

    @ray.remote
    def apply_replies(static, lab, *reps):
        nodes = static["nodes"]
        rx = np.concatenate([r[0] for r in reps])
        rl = np.concatenate([r[1] for r in reps])
        new = lab.copy()
        if len(rx):
            np.minimum.at(new, np.searchsorted(nodes, rx), rl)
        changed = int((new != lab).sum())
        return new, changed

    @ray.remote
    def to_table(static, lab) -> pa.Table:
        return pa.table({
            "doc_id": pa.array(static["nodes"]),
            "cluster_id": pa.array(lab),
        })

    return shard_edges, build_part, propose, answer_apply, apply_replies, to_table


def _cc_bsp(edges, num_parts: int = BSP_PARTS, max_rounds: int = 60):
    """The large-graph plan: BSP rounds over raw Ray tasks (see module
    docstring).  ``edges`` is a materialized (a, b) Dataset."""
    import ray
    import ray.data

    shard_edges, build_part, propose, answer_apply, apply_replies, to_table = (
        _bsp_remotes()
    )
    P = num_parts

    blocks = edges.to_arrow_refs()
    # exchange 0: route bidirectional edges to their source's partition
    shard_refs = [
        shard_edges.options(num_returns=P).remote(b, P) for b in blocks
    ]
    built = [
        build_part.options(num_returns=2).remote(
            *[shard_refs[j][p] for j in range(len(blocks))]
        )
        for p in range(P)
    ]
    statics = [b[0] for b in built]
    labs = [b[1] for b in built]

    for _ in range(max_rounds):
        waves = [propose.options(num_returns=P).remote(statics[p], labs[p], P)
                 for p in range(P)]
        ans = [
            answer_apply.options(num_returns=P + 2).remote(
                statics[p], labs[p], P, *[waves[q][p] for q in range(P)]
            )
            for p in range(P)
        ]
        fin = [
            apply_replies.options(num_returns=2).remote(
                statics[p], ans[p][P], *[ans[q][p] for q in range(P)]
            )
            for p in range(P)
        ]
        labs = [f[0] for f in fin]
        changed = sum(ray.get([a[P + 1] for a in ans])) + sum(
            ray.get([f[1] for f in fin])
        )
        if changed == 0:
            break

    tabs = [to_table.remote(statics[p], labs[p]) for p in range(P)]
    return ray.data.from_arrow_refs(tabs)


def connected_components(edges, max_rounds: int = 60,
                         small_graph_rows: int = SMALL_GRAPH_ROWS,
                         num_parts: int = BSP_PARTS):
    """(a, b) edge Dataset → (doc_id, cluster_id) Dataset.

    ``cluster_id`` is the minimum node id of the component.  Isolated
    nodes (absent from the edge list) are not emitted — callers union
    them back if needed.

    Adaptive: an edge list within ``small_graph_rows`` solves in ONE
    vectorized task; beyond it, the BSP task rounds take over.  Both
    plans are equivalence-tested."""
    edges = edges.select_columns(["a", "b"]).materialize()
    if edges.count() == 0:
        import ray.data

        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array([], type=pa.int64()),
            "cluster_id": pa.array([], type=pa.int64()),
        }))
    if edges.count() <= small_graph_rows:
        # one remote task over the materialized edge block refs — no
        # Repartition barrier; the budget bounds the single-task size
        import ray
        import ray.data

        @ray.remote
        def run(*tbls):
            return _cc_local(pa.concat_tables(
                [t for t in tbls if t.num_columns]).combine_chunks())

        return ray.data.from_arrow(
            ray.get(run.remote(*edges.to_arrow_refs())))
    return _cc_bsp(edges, num_parts=num_parts, max_rounds=max_rounds)


# ---------------------------------------------------------------------------
# Triangle counting


def triangle_count(edges, num_parts: int = 64,
                   out_col: str = "n_triangles"):
    """EXACT distributed TRIANGLE COUNT over an undirected edge Dataset
    ``(a, b)`` (any orientation / duplicates — canonicalized first).

    The node-iterator plan (the standard distributed formulation —
    cf. Suri & Vassilvitskii, "Counting Triangles and the Curse of the
    Last Reducer", WWW'11):

    1. canonicalize + dedup edges ``(lo, hi), lo < hi`` — one hash
       exchange on (lo, hi);
    2. group edges by ``lo`` (each triangle a<b<c is charged to its
       SMALLEST vertex, so every wedge is generated exactly once):
       per hub, emit all neighbour pairs (b, c), b < c — the wedges;
    3. union wedges with the edge set, ONE hash exchange on (b, c);
       a wedge closes a triangle iff its (b, c) is an edge — count
       matches per partition, fold the per-partition counts.

    Exchange volume: E (dedup) + W (wedges, Σ_hub d·(d−1)/2) + E
    (closure check).  W is the method's known hot-spot — the lo<hi
    orientation already bounds hub degree by the HIGHER-id neighbour
    count (the classic high-degree mitigation); a power-law graph at
    100 TB would additionally split hubs into neighbour chunks (cap
    documented, not needed at bench scales).

    Returns a one-row Dataset ``(n_triangles BIGINT)``.
    """
    import pyarrow.compute as pc

    from engine.rayds.shuffle import hash_exchange_groups, tree_fold_refs

    def canon(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        lo = np.minimum(a, b)
        hi = np.maximum(a, b)
        keep = lo < hi  # drop self-loops
        t = pa.table({"lo": pa.array(lo[keep]), "hi": pa.array(hi[keep])})
        # block-local dedup (combiner) before the exchange
        return t.group_by(["lo", "hi"]).aggregate([])

    def dedup_part(group: pa.Table) -> pa.Table:
        return group.drop_columns(["_part"]).group_by(
            ["lo", "hi"]).aggregate([])

    e = edges.map_batches(canon, batch_format="pyarrow", batch_size=None,
                          zero_copy_batch=True)
    e = hash_exchange_groups(e, ["lo", "hi"], dedup_part,
                             num_parts).materialize()

    def wedges_part(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_part"])
        lo = g["lo"].to_numpy()
        hi = g["hi"].to_numpy()
        order = np.lexsort((hi, lo))
        lo, hi = lo[order], hi[order]
        n = len(lo)
        if n == 0:
            return pa.table({"b": pa.array([], type=pa.int64()),
                             "c": pa.array([], type=pa.int64()),
                             "_w": pa.array([], type=pa.int64())})
        starts = np.nonzero(np.r_[True, lo[1:] != lo[:-1]])[0]
        ends = np.append(starts[1:], n)
        outs_b, outs_c = [], []
        for s, t in zip(starts, ends):
            nb = hi[s:t]  # sorted ascending (lexsort minor key)
            d = len(nb)
            if d < 2:
                continue
            iu, ju = np.triu_indices(d, k=1)
            outs_b.append(nb[iu])
            outs_c.append(nb[ju])
        if not outs_b:
            return pa.table({"b": pa.array([], type=pa.int64()),
                             "c": pa.array([], type=pa.int64()),
                             "_w": pa.array([], type=pa.int64())})
        b = np.concatenate(outs_b)
        c = np.concatenate(outs_c)
        return pa.table({"b": pa.array(b), "c": pa.array(c),
                         "_w": pa.array(np.ones(len(b), dtype=np.int64))})

    wedges = hash_exchange_groups(e, ["lo"], wedges_part, num_parts)
    etag = e.map_batches(
        lambda t: pa.table({"b": t["lo"], "c": t["hi"],
                            "_w": pa.array(np.zeros(len(t), np.int64))}),
        batch_format="pyarrow", batch_size=None)

    def close_part(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_part"])
        b = g["b"].to_numpy()
        c = g["c"].to_numpy()
        w = g["_w"].to_numpy()
        is_edge = w == 0
        # INJECTIVE pair key: rank-encode both components within the
        # partition (a multiplicative hash fold could collide and
        # overcount; ranks are bounded by the partition's row count so
        # rank_b · span + rank_c never overflows int64)
        ub = np.unique(b)
        uc = np.unique(c)
        span = np.int64(len(uc) + 1)
        key = np.searchsorted(ub, b) * span + np.searchsorted(uc, c)
        ek = key[is_edge]
        wk = key[~is_edge]
        ek.sort()
        if len(ek) == 0 or len(wk) == 0:
            return pa.table({out_col: pa.array([0], type=pa.int64())})
        pos = np.searchsorted(ek, wk)
        pos = np.minimum(pos, len(ek) - 1)
        cnt = int(np.count_nonzero(ek[pos] == wk))
        return pa.table({out_col: pa.array([cnt], type=pa.int64())})

    closed = hash_exchange_groups(wedges.union(etag), ["b", "c"],
                                  close_part, num_parts)
    tot = tree_fold_refs(
        closed,
        lambda tbls: pa.table({out_col: pa.array(
            [sum(int(pc.sum(t[out_col]).as_py() or 0) for t in tbls)],
            type=pa.int64())}))
    import ray.data

    return ray.data.from_arrow(tot)


# ---------------------------------------------------------------------------
# PageRank


def _pr_remotes():
    """Late-bound ray.remote task definitions for the PageRank BSP (same
    reasoning as the CC plan: an iterative update over shared mutable
    rank state is the one shape the Dataset API can't express — a
    Dataset realization costs seconds of fixed executor overhead PER
    ROUND; these waves are pure numpy + P-way object exchanges)."""
    import ray

    @ray.remote
    def shard(block: pa.Table, num_parts: int):
        # out-edges routed by hash(src) — the partition that OWNS a node
        # (by hash) also holds all its out-edges, so contributions read
        # local pr; node announcements (src ∪ dst) establish ownership
        # of dst-only nodes.
        s = block["src"].to_numpy()
        d = block["dst"].to_numpy()
        ann = np.concatenate([s, d])
        return tuple(
            e + (a[0],)
            for e, a in zip(_route(s, num_parts, s, d),
                            _route(ann, num_parts, ann))
        )

    @ray.remote
    def build(*bundles):
        srcs = [x[0] for x in bundles if len(x[0])]
        dsts = [x[1] for x in bundles if len(x[1])]
        anns = [x[2] for x in bundles if len(x[2])]
        src = np.concatenate(srcs) if srcs else np.empty(0, np.int64)
        dst = np.concatenate(dsts) if dsts else np.empty(0, np.int64)
        ann = np.concatenate(anns) if anns else np.empty(0, np.int64)
        nodes = np.unique(ann)
        esrc = np.searchsorted(nodes, src)
        outdeg = np.zeros(len(nodes), np.int64)
        np.add.at(outdeg, esrc, 1)
        return ({"nodes": nodes, "esrc": esrc, "edst": dst,
                 "outdeg": outdeg}, len(nodes))

    @ray.remote
    def init_pr(static, n_total: int):
        return np.full(len(static["nodes"]), 1.0 / n_total)

    @ray.remote
    def contribute(static, pr, num_parts: int):
        # per-edge contribution pr[src]/outdeg[src] routed to hash(dst);
        # dangling mass (nodes with no out-edges) is ONE float to the
        # driver for uniform redistribution — the standard treatment.
        deg = static["outdeg"]
        w = np.divide(pr, deg, out=np.zeros_like(pr), where=deg > 0)
        vals = w[static["esrc"]]
        dangling = float(pr[deg == 0].sum())
        return tuple(_route(static["edst"], num_parts,
                            static["edst"], vals)) + (dangling,)

    @ray.remote
    def apply(static, pr, n_total: int, damping: float,
              dangling_total: float, *msgs):
        nodes = static["nodes"]
        acc = np.zeros(len(nodes))
        for dst, val in msgs:  # partition-order concat → deterministic
            if len(dst):
                np.add.at(acc, np.searchsorted(nodes, dst), val)
        new = ((1.0 - damping) / n_total
               + damping * (acc + dangling_total / n_total))
        return new, float(np.abs(new - pr).sum())

    @ray.remote
    def to_table(static, pr) -> pa.Table:
        return pa.table({"node": pa.array(static["nodes"]),
                         "pr": pa.array(pr)})

    return shard, build, init_pr, contribute, apply, to_table


def pagerank(edges, damping: float = 0.85, iters: int = 20,
             tol: float = 0.0, num_parts: int = BSP_PARTS):
    """Directed (src, dst) edge Dataset → (node, pr) Dataset — PageRank
    with uniform dangling-mass redistribution, run as BSP rounds over
    raw Ray tasks on a static hash partitioning of the node space.

    Per round: 2 task waves, P² narrow (dst, float) exchange bundles
    through the object store, and P floats (dangling mass) + P floats
    (L1 delta) to the driver.  Stops after ``iters`` rounds or when the
    L1 delta falls below ``tol``.  Determinism: bundles fold in fixed
    partition order, so ranks are bit-reproducible run-to-run."""
    import ray
    import ray.data

    shard, build, init_pr, contribute, apply, to_table = _pr_remotes()
    P = num_parts
    edges = edges.select_columns(["src", "dst"]).materialize()
    blocks = edges.to_arrow_refs()
    if not blocks or edges.count() == 0:
        return ray.data.from_arrow(pa.table({
            "node": pa.array([], type=pa.int64()),
            "pr": pa.array([], type=pa.float64()),
        }))
    shard_refs = [shard.options(num_returns=P).remote(b, P)
                  for b in blocks]
    built = [
        build.options(num_returns=2).remote(
            *[shard_refs[j][p] for j in range(len(blocks))])
        for p in range(P)
    ]
    statics = [b[0] for b in built]
    n_total = sum(ray.get([b[1] for b in built]))
    prs = [init_pr.remote(statics[p], n_total) for p in range(P)]

    for _ in range(iters):
        waves = [
            contribute.options(num_returns=P + 1).remote(
                statics[p], prs[p], P)
            for p in range(P)
        ]
        dangling_total = sum(ray.get([w[P] for w in waves]))
        fin = [
            apply.options(num_returns=2).remote(
                statics[p], prs[p], n_total, damping, dangling_total,
                *[waves[q][p] for q in range(P)])
            for p in range(P)
        ]
        prs = [f[0] for f in fin]
        delta = sum(ray.get([f[1] for f in fin]))
        if delta <= tol:
            break

    tabs = [to_table.remote(statics[p], prs[p]) for p in range(P)]
    return ray.data.from_arrow_refs(tabs)


# ----------------------------------------------- weighted SSSP (BSP rounds)
_INF = np.int64(1 << 62)


def _sssp_remotes():
    import ray

    @ray.remote
    def shard_wedges(block: pa.Table, num_parts: int):
        if block.num_columns == 0 or block.num_rows == 0:
            # Ray 2.49 drops the schema of zero-row map outputs: an
            # empty (possibly column-less) edge block routes nothing
            z = np.empty(0, dtype=np.int64)
            return tuple(_route(z, num_parts, z, z, z))
        a = block["a"].to_numpy()
        b = block["b"].to_numpy()
        w = block["w"].to_numpy()
        src = np.concatenate([a, b])
        dst = np.concatenate([b, a])
        ww = np.concatenate([w, w])
        return tuple(_route(src, num_parts, src, dst, ww))

    @ray.remote
    def build_part(source: int, *bundles):
        srcs = [x[0] for x in bundles if x is not None and len(x[0])]
        dsts = [x[1] for x in bundles if x is not None and len(x[1])]
        ws = [x[2] for x in bundles if x is not None and len(x[2])]
        src = np.concatenate(srcs) if srcs else np.empty(0, np.int64)
        dst = np.concatenate(dsts) if dsts else np.empty(0, np.int64)
        w = np.concatenate(ws) if ws else np.empty(0, np.int64)
        nodes, esrc = np.unique(src, return_inverse=True)
        dist = np.full(len(nodes), _INF, dtype=np.int64)
        hit = np.searchsorted(nodes, source)
        if hit < len(nodes) and len(nodes) and nodes[hit] == source:
            dist[hit] = 0
        return {"nodes": nodes, "esrc": esrc, "edst": dst, "ew": w}, dist

    @ray.remote
    def relax(static, dist, num_parts: int):
        # proposals (dst, dist[src] + w) for every FINITE-source edge
        d = dist[static["esrc"]]
        fin = d < _INF
        pn = static["edst"][fin]
        pc = d[fin] + static["ew"][fin]
        return tuple(_route(pn, num_parts, pn, pc))

    @ray.remote
    def fold(static, dist, *msgs):
        nodes = static["nodes"]
        pn = np.concatenate([m[0] for m in msgs]) if msgs else \
            np.empty(0, np.int64)
        pc = np.concatenate([m[1] for m in msgs]) if msgs else \
            np.empty(0, np.int64)
        new = dist.copy()
        if len(pn):
            np.minimum.at(new, np.searchsorted(nodes, pn), pc)
        return new, int((new != dist).sum())

    @ray.remote
    def to_table(static, dist) -> pa.Table:
        keep = dist < _INF
        return pa.table({"node": pa.array(static["nodes"][keep]),
                         "cost": pa.array(dist[keep])})

    return shard_wedges, build_part, relax, fold, to_table


def sssp(edges, source: int = 0, num_parts: int = BSP_PARTS,
         max_rounds: int = 10_000):
    """UNBOUNDED-DEPTH single-source shortest paths over a weighted
    (a, b, w) edge Dataset — distributed Bellman-Ford as BSP rounds
    over raw Ray tasks (the weighted sibling of the CC hash-min plan;
    the Dataset API can't express the shared mutable distance state
    without a fresh executor run per round).

    Per round: 2 task waves — *relax* (per-partition finite-source edge
    proposals ``dist[src]+w`` routed by hash(dst)) and *fold*
    (vectorized ``np.minimum.at`` + changed count, one int per task to
    the driver).  Distances only ever DECREASE, so waves are
    order-free and the fixpoint is the true shortest-path cost
    (standard Bellman-Ford argument); rounds = shortest-path hop
    radius.  Exchange volume per round ≤ 2·E narrow int64 entries,
    partition-to-partition (never the driver).  Returns a (node, cost)
    Dataset of REACHED nodes only; the fixed-depth Dataset plan
    (__ray_entry__._q_sssp_min_cost) is the SQL-checkable sibling."""
    import ray
    import ray.data

    shard_wedges, build_part, relax, fold, to_table = _sssp_remotes()
    P = num_parts
    blocks = edges.materialize().to_arrow_refs()
    shard_refs = [
        shard_wedges.options(num_returns=P).remote(b, P) for b in blocks
    ]
    built = [
        build_part.options(num_returns=2).remote(
            source, *[shard_refs[j][p] for j in range(len(blocks))]
        )
        for p in range(P)
    ]
    statics = [b[0] for b in built]
    dists = [b[1] for b in built]

    for _ in range(max_rounds):
        waves = [relax.options(num_returns=P).remote(statics[p], dists[p], P)
                 for p in range(P)]
        fin = [
            fold.options(num_returns=2).remote(
                statics[p], dists[p], *[waves[q][p] for q in range(P)]
            )
            for p in range(P)
        ]
        dists = [f[0] for f in fin]
        if sum(ray.get([f[1] for f in fin])) == 0:
            break

    tabs = [to_table.remote(statics[p], dists[p]) for p in range(P)]
    return ray.data.from_arrow_refs(tabs)
