"""Approximate-nearest-neighbor search over the ``embeddings`` table.

Baseline: brute-force cosine top-k — each ``map_batches`` task matmuls
its batch against the BROADCAST query matrix (``ray.put`` once) and
emits only its local top-k per query; a tiny groupby merges the partial
top-k sets (k × n_blocks candidate rows, never the full score matrix).
Scale path: LSH-bucketed variant — random-hyperplane sign buckets
restrict each query to matching buckets (same band machinery as
SimHash dedup).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _unit(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    return mat / norms[:, None]


class TopKScorer:
    """Actor stage: local top-k of this batch's vectors per query."""

    def __init__(self, queries_ref, query_ids_ref, k: int):
        import ray

        q = ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) else queries_ref
        self.qids = (
            ray.get(query_ids_ref) if isinstance(query_ids_ref, ray.ObjectRef) else query_ids_ref
        )
        self.q = _unit(np.asarray(q, dtype=np.float64))
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        from engine.ops.dedup import _emb_matrix

        ids = batch["vec_id"].to_numpy()
        emb = _emb_matrix(batch["embedding"])
        sims = self.q @ _unit(emb).T  # (nq, nbatch)
        nq, nb = sims.shape
        kk = min(self.k, nb)
        # argpartition bounded top-k per query, then exact order
        part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        rows = []
        for qi in range(nq):
            cand = part[qi]
            rows.append((np.full(kk, self.qids[qi]), ids[cand], sims[qi, cand]))
        return pa.table(
            {
                "query_id": pa.array(np.concatenate([r[0] for r in rows])),
                "vec_id": pa.array(np.concatenate([r[1] for r in rows])),
                "sim": pa.array(np.concatenate([r[2] for r in rows])),
            }
        )


def _merge_topk(k: int):
    def merge(group: pa.Table) -> pa.Table:
        sims = group["sim"].to_numpy()
        ids = group["vec_id"].to_numpy()
        q = group["query_id"].to_numpy()
        # rank: round(sim, 6) desc, then vec_id asc (deterministic ties —
        # matches the SQL oracle's ORDER BY)
        order = np.lexsort((ids, -np.round(sims, 6)))[:k]
        return pa.table(
            {
                "query_id": pa.array(q[order]),
                "vec_id": pa.array(ids[order]),
                "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
            }
        )

    return merge


def topk_cosine(ds, queries: np.ndarray, query_ids: np.ndarray, k: int = 10,
                exclude_self: bool = True, concurrency=None):
    """Dataset pipeline: brute-force cosine top-k (the ANN baseline).

    Task-based with a per-worker cached (unit-normalized) query matrix —
    prepared-state semantics without actor-pool spawn cost; pass
    ``concurrency`` to force the explicit actor-pool form instead."""
    import ray

    kk = k + (1 if exclude_self else 0)
    if concurrency is not None:
        qref = ray.put(np.asarray(queries, dtype=np.float64))
        idref = ray.put(np.asarray(query_ids, dtype=np.int64))
        local = ds.map_batches(
            TopKScorer,
            fn_constructor_kwargs={"queries_ref": qref, "query_ids_ref": idref,
                                   "k": kk},
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=4096,
            concurrency=concurrency,
        )
    else:
        from engine.rayds.bcast import cached

        bundle = ray.put(
            (np.asarray(queries, dtype=np.float64),
             np.asarray(query_ids, dtype=np.int64), kk)
        )

        def build_scorer(b):
            q, ids, kk_ = b
            return TopKScorer(q, ids, kk_)

        def score(batch):
            return cached(bundle, build_scorer)(batch)

        local = ds.map_batches(
            score, batch_format="pyarrow", zero_copy_batch=True, batch_size=4096
        )
    if exclude_self:
        import pyarrow.compute as pc

        local = local.map_batches(
            lambda b: b.filter(pc.not_equal(b["query_id"], b["vec_id"])),
            batch_format="pyarrow", batch_size=None,
        )
    from engine.rayds.shuffle import hash_exchange_fine_groups

    return hash_exchange_fine_groups(local, ["query_id"], _merge_topk(k))


# ------------------------------------------------------------- LSH variant
class LSHBucketer:
    """+ bucket:int64 — random-hyperplane sign hash (nbits planes)."""

    def __init__(self, planes_ref):
        import ray

        p = ray.get(planes_ref) if isinstance(planes_ref, ray.ObjectRef) else planes_ref
        self.planes = np.asarray(p, dtype=np.float64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from engine.ops.dedup import _emb_matrix

        emb = _emb_matrix(batch["embedding"])
        signs = (emb @ self.planes.T) > 0
        bucket = np.zeros(len(emb), dtype=np.int64)
        for b in range(signs.shape[1]):
            bucket |= signs[:, b].astype(np.int64) << b
        return batch.append_column("bucket", pa.array(bucket))


def make_planes(dim: int, nbits: int = 8, seed: int = 7) -> np.ndarray:
    return np.random.default_rng(seed).standard_normal((nbits, dim))


def topk_cosine_lsh(ds, queries: np.ndarray, query_ids: np.ndarray, k: int = 10,
                    nbits: int = 6, dim: int = 64, concurrency=None,
                    multiprobe: int = 1):
    """LSH-restricted top-k: score only vectors whose bucket matches a
    query's probe set (approximate — recall < 1; the 100-TB path where
    the brute-force matmul is infeasible).  Bucket assignment is an
    actor-pool stage; the per-bucket filter runs before any scoring.

    ``multiprobe`` = Hamming radius of extra probed buckets around each
    query's bucket (standard multi-probe LSH): radius 1 probes 1+nbits
    of the 2^nbits buckets and, on isotropic data, roughly doubles
    recall for a proportional scan-cost increase."""
    import itertools

    import ray

    planes = make_planes(dim, nbits)
    pref = ray.put(planes)
    q = np.asarray(queries, dtype=np.float64)
    qbuckets = set()
    signs = (q @ planes.T) > 0
    for row in signs:
        b = 0
        for i, s in enumerate(row):
            b |= int(s) << i
        qbuckets.add(b)
    if multiprobe > 0:
        base = list(qbuckets)
        for b in base:
            for r in range(1, multiprobe + 1):
                for flips in itertools.combinations(range(nbits), r):
                    fb = b
                    for f in flips:
                        fb ^= 1 << f
                    qbuckets.add(fb)
    if concurrency is not None:
        bucketed = ds.map_batches(
            LSHBucketer,
            fn_constructor_kwargs={"planes_ref": pref},
            batch_format="pyarrow", batch_size=None,
            zero_copy_batch=True,
            concurrency=concurrency,
        )
    else:
        # task-based with a per-worker cached bucketer: same broadcast
        # semantics, no actor-pool spawn latency
        from engine.rayds.bcast import cached

        def bucket_fn(batch):
            return cached(pref, LSHBucketer)(batch)

        bucketed = ds.map_batches(
            bucket_fn, batch_format="pyarrow", batch_size=None,
            zero_copy_batch=True,
        )
    import pyarrow.compute as pc

    filtered = bucketed.map_batches(
        lambda b: b.filter(pc.is_in(b["bucket"], value_set=pa.array(sorted(qbuckets)))),
        batch_format="pyarrow", batch_size=None,
    )
    return topk_cosine(filtered, queries, query_ids, k=k, concurrency=concurrency)


# ------------------------------------------------------------- IVF variant
def train_ivf_centroids(sample: np.ndarray, n_lists: int = 16,
                        iters: int = 10, seed: int = 13) -> np.ndarray:
    """Deterministic spherical k-means on a SAMPLE (driver-side is fine:
    the sample is bounded, not the dataset) → (n_lists, dim) unit
    centroids.  The IVF coarse quantizer of the classic
    inverted-file ANN index (Jégou et al., PAMI 2011)."""
    x = _unit(np.asarray(sample, dtype=np.float64))
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(x), size=min(n_lists, len(x)), replace=False)
    cents = x[idx].copy()
    for _ in range(iters):
        assign = np.argmax(x @ cents.T, axis=1)
        for c in range(len(cents)):
            m = assign == c
            if m.any():
                v = x[m].mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cents[c] = v / n
    return cents


class IVFAssign:
    """+ ivf_list:int64 — nearest-centroid id per vector (actor-pool
    stage holding the broadcast centroid matrix)."""

    def __init__(self, cents_ref):
        import ray

        c = ray.get(cents_ref) if isinstance(cents_ref, ray.ObjectRef) else cents_ref
        self.cents = _unit(np.asarray(c, dtype=np.float64))

    def __call__(self, batch: pa.Table) -> pa.Table:
        from engine.ops.dedup import _emb_matrix

        emb = _unit(_emb_matrix(batch["embedding"]))
        assign = np.argmax(emb @ self.cents.T, axis=1).astype(np.int64)
        return batch.append_column("ivf_list", pa.array(assign))


def topk_cosine_ivf(ds, queries: np.ndarray, query_ids: np.ndarray,
                    k: int = 10, n_lists: int = 16, nprobe: int = 4,
                    sample_rows: int = 4096, concurrency=None):
    """IVF top-k: coarse-quantize every vector to its nearest centroid
    (one actor-pool pass), then score a query ONLY against the vectors
    of its ``nprobe`` closest lists — the classic inverted-file ANN scale
    path (≈ nprobe/n_lists of the data scanned; recall < 1).  Centroids
    are trained on a bounded sample and broadcast once."""
    import pyarrow.compute as pc
    import ray

    sample = ds.limit(sample_rows).take_batch(sample_rows, batch_format="pyarrow")
    from engine.ops.dedup import _emb_matrix

    cents = train_ivf_centroids(_emb_matrix(sample["embedding"]), n_lists)
    cref = ray.put(cents)
    q = _unit(np.asarray(queries, dtype=np.float64))
    probe_lists = np.argsort(-(q @ cents.T), axis=1)[:, :nprobe]
    wanted = pa.array(np.unique(probe_lists).astype(np.int64))
    if concurrency is not None:
        assigned = ds.map_batches(
            IVFAssign,
            fn_constructor_kwargs={"cents_ref": cref},
            batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
            concurrency=concurrency,
        )
    else:
        from engine.rayds.bcast import cached

        def assign_fn(batch):
            return cached(cref, IVFAssign)(batch)

        assigned = ds.map_batches(
            assign_fn, batch_format="pyarrow", batch_size=None,
            zero_copy_batch=True,
        )
    filtered = assigned.map_batches(
        lambda b: b.filter(pc.is_in(b["ivf_list"], value_set=wanted)),
        batch_format="pyarrow", batch_size=None,
    )
    return topk_cosine(filtered, queries, query_ids, k=k)


def kmeans_full(ds, k: int = 8, iters: int = 20, tol: float = 1e-6,
                col: str = "embedding", sample_rows: int = 4096):
    """FULL-DATASET distributed spherical k-means (Lloyd): the iterative
    centroid refinement the sampled IVF trainer approximates.

    Iteration runs over RAW RAY TASKS on the materialized blocks (same
    finding as the CC BSP: a fresh Dataset execution per round costs
    ~0.7 s of fixed executor overhead; the per-round task wave is
    milliseconds).  Per round — NO shuffle, the canonical
    broadcast-iterate shape: centroids broadcast once via ``ray.put``;
    one task per block computes assignments (one matmul) and its
    (k × dim sum-matrix, k counts); a 64-way task fold reduces them and
    the driver (one k × dim matrix) renormalizes.  Convergence = max
    centroid movement < ``tol``.

    Returns (centroids (k, dim) unit ndarray, counts (k,) int64).
    Deterministic: farthest-point init on a bounded ``limit`` sample.
    """
    import ray

    from engine.ops.dedup import _emb_matrix

    # materialize the projected column ONCE — every Lloyd round re-scans
    # it via block refs; re-reading the source per round would multiply
    # the scan cost by the round count
    ds = ds.select_columns([col]).materialize()
    sample_tab = pa.concat_tables(
        ds.limit(sample_rows).iter_batches(batch_format="pyarrow")
    )
    x = _unit(_emb_matrix(sample_tab[col]))
    # deterministic FARTHEST-POINT init (k-means++-style, no RNG): for
    # separated clusters this seeds one centroid per cluster, avoiding
    # the split/merge local optima of random-point init
    chosen = [0]
    best = x @ x[0]
    for _ in range(min(k, len(x)) - 1):
        nxt = int(np.argmin(best))
        chosen.append(nxt)
        best = np.maximum(best, x @ x[nxt])
    cents = x[chosen].copy()
    k = len(cents)  # the sample may hold fewer than k rows

    @ray.remote
    def block_partial(block: pa.Table, cents_ref):
        c = cents_ref
        if len(block) == 0:  # empty blocks: (0,0) matmul would crash
            return (np.zeros((len(c), c.shape[1])),
                    np.zeros(len(c), dtype=np.int64))
        emb = _unit(_emb_matrix(block[col]))
        assign = np.argmax(emb @ c.T, axis=1)
        sums = np.zeros((len(c), emb.shape[1]))
        np.add.at(sums, assign, emb)
        return sums, np.bincount(assign, minlength=len(c)).astype(np.int64)

    @ray.remote
    def fold(*parts):
        s = sum(p[0] for p in parts)
        n = sum(p[1] for p in parts)
        return s, n

    blocks = ds.to_arrow_refs()
    counts = np.zeros(k, dtype=np.int64)
    for _ in range(iters):
        ref = ray.put(cents)
        parts = [block_partial.remote(b, ref) for b in blocks]
        # 64-way task fold so the driver receives O(B/64) partials even
        # at very large block counts
        while len(parts) > 64:
            parts = [fold.remote(*parts[i:i + 64])
                     for i in range(0, len(parts), 64)]
        sums = np.zeros_like(cents)
        counts = np.zeros(k, dtype=np.int64)
        for s, n in ray.get(parts):
            sums += s
            counts += n
        new = cents.copy()
        for c_id in range(k):
            if counts[c_id] > 0:
                nrm = np.linalg.norm(sums[c_id])
                if nrm > 0:
                    new[c_id] = sums[c_id] / nrm
        move = float(np.abs(new - cents).max())
        cents = new
        if move < tol:
            break
    return cents, counts


# --------------------------------------------------- product quantization
def pq_train(sample: np.ndarray, m: int = 8, k: int = 16,
             iters: int = 25) -> np.ndarray:
    """Train a PRODUCT-QUANTIZATION codebook on a bounded driver sample
    (the IVF-trainer pattern: the model is small and fixed-size; the
    full pass is the encode stage).  Per subspace: deterministic
    farthest-point init + Lloyd.  Returns (m, k_eff, dim/m)."""
    n, d = sample.shape
    assert d % m == 0, (d, m)
    sub = d // m
    k_eff = min(k, n)
    books = np.zeros((m, k_eff, sub))
    for j in range(m):
        x = sample[:, j * sub:(j + 1) * sub]
        chosen = [0]
        d2 = ((x - x[0]) ** 2).sum(1)
        for _ in range(k_eff - 1):
            nxt = int(np.argmax(d2))
            chosen.append(nxt)
            d2 = np.minimum(d2, ((x - x[nxt]) ** 2).sum(1))
        c = x[chosen].copy()
        for _ in range(iters):
            # assignment via GEMM (argmin of -2x·cᵀ + |c|²; |x|² constant
            # per row) — the (n, k, sub) broadcast tensor dominated
            # training time
            d2 = -2.0 * (x @ c.T) + (c * c).sum(1)[None, :]
            a = np.argmin(d2, axis=1)
            cnt = np.bincount(a, minlength=k_eff).astype(np.float64)
            sums = np.zeros((k_eff, sub))
            np.add.at(sums, a, x)
            nz = cnt > 0
            c[nz] = sums[nz] / cnt[nz, None]
        books[j] = c
    return books


def pq_encode_batch(emb: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, d) float → (n, m) uint8 codes: per-subspace nearest centroid
    (one (n, k) distance matrix per subspace — vectorized)."""
    m, _, sub = books.shape
    codes = np.empty((len(emb), m), dtype=np.uint8)
    for j in range(m):
        x = emb[:, j * sub:(j + 1) * sub]
        c = books[j]
        # GEMM form (|x|² is constant per row, dropped for argmin)
        d2 = -2.0 * (x @ c.T) + (c * c).sum(1)[None, :]
        codes[:, j] = np.argmin(d2, axis=1).astype(np.uint8)
    return codes


def pq_topk(ds, queries: np.ndarray, query_ids: np.ndarray, k: int = 10,
            m: int = 8, kcent: int = 16, sample_rows: int = 2048,
            col: str = "embedding"):
    """PQ-compressed approximate top-k by ASYMMETRIC distance (ADC):
    train the codebook on a bounded sample, broadcast it once, encode +
    score every block in ONE streaming pass (per-query K×m lookup
    tables; scoring is a table-gather sum, never a full matmul), local
    top-k per block, one fine-key merge exchange.  The 100-TB shape:
    vectors compress dim·4 bytes → m bytes (32× here), the scan reads
    codes not floats; recall-vs-exact is pinned by pytest."""
    import ray

    from engine.ops.dedup import _emb_matrix
    from engine.rayds.bcast import cached
    from engine.rayds.shuffle import hash_exchange_fine_groups

    mat = ds.select_columns(["vec_id", col]).materialize()
    sample_tab = pa.concat_tables(
        mat.limit(sample_rows).iter_batches(batch_format="pyarrow"))
    sample = _unit(_emb_matrix(sample_tab[col]))
    books = pq_train(sample, m=m, k=kcent)
    q = _unit(np.asarray(queries, dtype=np.float64))
    qids = np.asarray(query_ids, dtype=np.int64)
    # per-query ADC tables: dt[qi, j, code] = ||q_sub − c||²
    sub = books.shape[2]
    dt = np.zeros((len(q), books.shape[0], books.shape[1]))
    for j in range(books.shape[0]):
        qs = q[:, j * sub:(j + 1) * sub]
        dt[:, j, :] = ((qs[:, None, :] - books[j][None]) ** 2).sum(2)
    bundle = ray.put((books, dt, qids, k))

    def build(b):
        return b

    def score(batch: pa.Table) -> pa.Table:
        books_, dt_, qids_, k_ = cached(bundle, build)
        emb = _unit(_emb_matrix(batch[col]))
        vid = batch["vec_id"].to_numpy()
        codes = pq_encode_batch(emb, books_)
        outs = []
        jj = np.arange(books_.shape[0])
        for qi in range(len(qids_)):  # loop over QUERIES (small), not rows
            s = dt_[qi][jj[None, :], codes].sum(1)  # (n,) gather-sum
            keep = vid != qids_[qi]
            ss, vv = s[keep], vid[keep]
            top = np.argsort(ss, kind="stable")[:k_]
            outs.append(pa.table({
                "query_id": pa.array(np.full(len(top), qids_[qi])),
                "vec_id": pa.array(vv[top]),
                "adc": pa.array(ss[top])}))
        return pa.concat_tables(outs)

    local = mat.map_batches(score, batch_format="pyarrow",
                            batch_size=4096, zero_copy_batch=True)

    def merge(group: pa.Table) -> pa.Table:
        s = group["adc"].to_numpy()
        ids = group["vec_id"].to_numpy()
        qq = group["query_id"].to_numpy()
        order = np.lexsort((ids, np.round(s, 9)))[:k]
        return pa.table({
            "query_id": pa.array(qq[order]),
            "vec_id": pa.array(ids[order]),
            "rank": pa.array(np.arange(1, len(order) + 1,
                                       dtype=np.int64))})

    return hash_exchange_fine_groups(local, ["query_id"], merge)
