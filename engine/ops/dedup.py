"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale shapes (SURVEY.md §2.8 / task brief):
- exact: combiner-first groupby on the text (or fp64 fingerprint at
  scale) keeping the lowest doc_id — hash-partition + per-group first.
- MinHash+LSH: shingle → 64 permutations → band buckets → candidate
  pairs via a bucket groupby (the all-to-all moves only (doc, band-hash)
  keys, never documents) → exact-Jaccard verification as a DISTRIBUTED
  hash join (pairs ⋈ per-doc shingle sets) + vectorized verify inside
  ``map_batches`` — nothing lands on the driver.
- SimHash: 64-bit sign-hash of token hashes; banded into 4×16-bit keys
  so near pairs (Hamming ≤ k) collide in ≥1 band.
- embedding cosine: EXACT threshold self-join as a block-pair plan
  (each of the P(P+1)/2 block pairs is one vectorized matmul task —
  O(N²/P²) work per task, O(P) replication, no driver materialization,
  no full-matrix broadcast); the approximate scale path is the LSH
  bucket pipeline sharing the ``ann.py`` hyperplane machinery.

All map stages are vectorized over Arrow buffers (no per-doc Python
loops): word hashing runs on the flat string byte buffer with
``np.add.reduceat`` segment sums; shingles / signatures / band hashes
are computed with segment reductions over doc offsets.

Every candidate-generating bucket group is capped at ``MAX_BUCKET``
members: a degenerate bucket (identical boilerplate docs) yields
chunked intra-bucket pairs — O(n·MAX_BUCKET) instead of O(n²) — and
exact duplicates are already caught by the exact-dedup pass.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

NUM_PERM = 64
BANDS = 16  # 16 bands × 4 rows ≈ threshold ~0.5 Jaccard
MAX_BUCKET = 1024  # cap on LSH bucket size before pair-generation chunking

# Bloom semi-join prefilter (verify stage): candidate doc ids are a tiny
# fraction of the corpus, so the docs side of the pairs⋈shingles cogroup
# is filtered through a fixed-size Bloom bitmap of the candidate-id set
# before it is shingled or shuffled — shuffle volume drops from O(corpus)
# to O(candidates + FP).  False positives only add doc rows that match no
# pair in the attach stage; the verified output is exactly unchanged.
BLOOM_BITS = 1 << 23  # 1 MiB packed; ~2e-3 FP rate at 10^5 keys (k=2)
_BLOOM_SHIFT = np.uint64(64 - 23)
_BLOOM_SALTS = (np.uint64(0x9E3779B97F4A7C15), np.uint64(0xC2B2AE3D27D4EB4F))
def _bloom_positions(ids: np.ndarray):
    u = ids.astype(np.uint64)
    return [((u * salt) >> _BLOOM_SHIFT).astype(np.int64)
            for salt in _BLOOM_SALTS]


def pairs_bloom(pairs_ds) -> bytes:
    """OR-reduce per-block Bloom partials of the candidate doc-id set.
    The driver holds ≤ blocks × 1 MiB transiently — bounded by block
    count, never by row count (the 100-TB-safe broadcast-build shape)."""

    def partial(batch: pa.Table) -> pa.Table:
        ids = np.concatenate(
            [batch["a"].to_numpy(), batch["b"].to_numpy()]
        )
        pos = np.unique(np.concatenate(_bloom_positions(ids))) if len(ids) \
            else np.empty(0, dtype=np.int64)
        if pos.nbytes * 8 <= BLOOM_BITS:
            # small block: ship the set positions, not a full bitmap
            payload = b"P" + pos.tobytes()
        else:
            bm = np.zeros(BLOOM_BITS, dtype=bool)
            bm[pos] = True
            payload = b"B" + np.packbits(bm).tobytes()
        return pa.table({"bm": pa.array([payload], type=pa.binary())})

    rows = pairs_ds.map_batches(
        partial, batch_format="pyarrow", batch_size=None
    ).take_all()
    acc = np.zeros(BLOOM_BITS, dtype=bool)
    for r in rows:
        raw = r["bm"]
        if raw[:1] == b"P":
            acc[np.frombuffer(raw[1:], dtype=np.int64)] = True
        else:
            acc |= np.unpackbits(
                np.frombuffer(raw[1:], dtype=np.uint8)
            ).view(bool)
    return np.packbits(acc).tobytes()


def make_bloom_filter_fn(bloom_ref, col: str = "doc_id"):
    """Row filter against a broadcast Bloom bitmap (``ray.put`` once,
    unpacked once per worker via the module cache)."""

    def _unpack(raw):
        return np.unpackbits(np.frombuffer(raw, dtype=np.uint8)).view(bool)

    def fn(batch: pa.Table) -> pa.Table:
        # per-worker LRU (size 4, engine/rayds/bcast.py): bounds pinning
        # without the capacity-1 thrash under concurrent pipelines
        from engine.rayds.bcast import cached

        bm = cached(bloom_ref, _unpack)
        ids = batch[col].to_numpy()
        keep = np.ones(len(ids), dtype=bool)
        for pos in _bloom_positions(ids):
            keep &= bm[pos]
        return batch.filter(pa.array(keep))

    return fn

_rng = np.random.default_rng(1234)
_PERM_A = _rng.integers(1, 1 << 62, size=NUM_PERM).astype(np.uint64) | np.uint64(1)
_PERM_B = _rng.integers(0, 1 << 62, size=NUM_PERM).astype(np.uint64)

_FNV_PRIME = np.uint64(1099511628211)
_MIX1 = np.uint64(0xFF51AFD7ED558CCD)
_MIX2 = np.uint64(0xC4CEB9FE1A85EC53)
# positional combine constants for word k-grams
_GRAM_C = np.array(
    [0x9E3779B97F4A7C15, 0xBF58476D1CE4E5B9, 0x94D049BB133111EB], dtype=np.uint64
)
SHINGLE_K = 3


def _mix64(h: np.ndarray) -> np.ndarray:
    h = h.copy()
    h ^= h >> np.uint64(33)
    h *= _MIX1
    h ^= h >> np.uint64(29)
    h *= _MIX2
    h ^= h >> np.uint64(32)
    return h


# per-band XOR salts: folding the band index into the bucket key keeps
# the LSH explode's exchange rows at one int64 key (see minhash_batch)
_BAND_SALTS = _mix64(
    (np.arange(BANDS, dtype=np.uint64) + np.uint64(1))
    * np.uint64(0x9E3779B97F4A7C15)
)


def _flat_word_hashes(texts) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized 64-bit hash of every whitespace token of every doc.

    Returns ``(hashes, doc_offsets)`` — ``hashes`` is the flat uint64
    token-hash array, ``doc_offsets`` (n_docs+1,) delimits each doc's
    tokens.  The whole computation runs on the Arrow string buffers:
    a positional polynomial hash is evaluated per byte and segment-summed
    with ``np.add.reduceat`` at word starts (wrapping uint64 arithmetic),
    then avalanche-mixed.  No per-doc or per-word Python loop.
    """
    arr = texts
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    words = pc.split_pattern(arr, " ")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    off0 = words.offsets.to_numpy().astype(np.int64)
    doc_off = off0 - off0[0]
    flat = pc.list_flatten(words)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    n = len(flat)
    if n == 0:
        return np.empty(0, dtype=np.uint64), doc_off
    bo = flat.offset
    voff = np.frombuffer(flat.buffers()[1], dtype=np.int32)[bo : bo + n + 1].astype(
        np.int64
    )
    lens = voff[1:] - voff[:-1]
    total = int(lens.sum())
    h = np.zeros(n, dtype=np.uint64)
    if total > 0:
        data = np.frombuffer(flat.buffers()[2], dtype=np.uint8)
        starts = np.repeat(voff[:-1], lens)
        cum = np.cumsum(lens) - lens
        within = np.arange(total, dtype=np.int64) - np.repeat(cum, lens)
        b = data[starts + within].astype(np.uint64)
        expo = np.repeat(lens, lens) - 1 - within
        maxlen = int(lens.max())
        # wrapping-uint64 powers of the FNV prime (array cumprod wraps
        # silently; scalar loops would warn on every overflow)
        powers = np.ones(maxlen, dtype=np.uint64)
        if maxlen > 1:
            powers[1:] = np.cumprod(
                np.full(maxlen - 1, _FNV_PRIME, dtype=np.uint64)
            )
        terms = (b + np.uint64(0x101)) * powers[expo]
        nz = lens > 0
        h[nz] = np.add.reduceat(terms, cum[nz])
    return _mix64(h), doc_off


def _doc_shingles(h: np.ndarray, doc_off: np.ndarray,
                  k: int = SHINGLE_K) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc SORTED UNIQUE word-k-gram shingle hashes (flat + offsets).

    Docs with ≥k words get a sliding window of positional combines; docs
    with 1..k-1 words get one combined shingle of all their words; empty
    docs get none.  Dedup/sort is one global lexsort over (doc, hash).
    """
    n_docs = len(doc_off) - 1
    nw = doc_off[1:] - doc_off[:-1]
    if len(h) == 0:
        return np.empty(0, dtype=np.uint64), np.zeros(n_docs + 1, dtype=np.int64)
    doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), nw)
    pos = np.arange(len(h), dtype=np.int64) - np.repeat(doc_off[:-1], nw)
    # sliding windows (docs with ≥ k words)
    win = (pos <= np.repeat(nw, nw) - k)
    ws = np.nonzero(win)[0]
    sh_win = np.zeros(len(ws), dtype=np.uint64)
    for j in range(k):
        sh_win += h[ws + j] * _GRAM_C[j]
    did_win = doc_of[ws]
    # short docs (< k words): one combined shingle
    short_doc = (nw > 0) & (nw < k)
    termsS = h * _GRAM_C[np.minimum(pos, k - 1)]
    idx = np.minimum(doc_off[:-1], len(h) - 1)
    allsum = np.add.reduceat(termsS, idx)
    sh_short = allsum[short_doc]
    did_short = np.nonzero(short_doc)[0].astype(np.int64)

    sh = np.concatenate([_mix64(sh_win), _mix64(sh_short)])
    did = np.concatenate([did_win, did_short])
    order = np.lexsort((sh, did))
    sh, did = sh[order], did[order]
    if len(sh):
        keep = np.ones(len(sh), dtype=bool)
        keep[1:] = (did[1:] != did[:-1]) | (sh[1:] != sh[:-1])
        sh, did = sh[keep], did[keep]
    counts = np.bincount(did, minlength=n_docs)
    sh_off = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(counts, out=sh_off[1:])
    return sh, sh_off


def _shingles(text: str, k: int = SHINGLE_K) -> np.ndarray:
    """Single-doc shingle set (kernel-level convenience for tests)."""
    h, doc_off = _flat_word_hashes(pa.array([text]))
    sh, _ = _doc_shingles(h, doc_off, k)
    return sh.view(np.int64)


def minhash_batch(batch: pa.Table) -> pa.Table:
    """documents → one row per (doc_id, bucket): the LSH explode, with
    the band index FOLDED into the bucket key (band-salted XOR) so the
    exchange moves one int64 key instead of two — 25% narrower rows
    through the biggest all-to-all.  A pair colliding in k bands still
    yields k distinct bucket keys (band salts differ), so per-band
    collision counts are preserved.

    Fully vectorized: per-perm minima via ``np.minimum.reduceat`` over the
    flat shingle array at doc offsets; band hashes via a polynomial fold
    over each band's rows.
    """
    ids = batch["doc_id"].to_numpy()
    h, doc_off = _flat_word_hashes(batch["text"])
    sh, sh_off = _doc_shingles(h, doc_off)
    nsh = sh_off[1:] - sh_off[:-1]
    ne = nsh > 0
    nd = int(ne.sum())
    if nd == 0:
        return pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "bucket": pa.array([], type=pa.int64()),
            }
        )
    segs = sh_off[:-1][ne]
    sig = np.empty((nd, NUM_PERM), dtype=np.uint64)
    for p in range(NUM_PERM):
        v = sh * _PERM_A[p] + _PERM_B[p]
        sig[:, p] = np.minimum.reduceat(v, segs)
    per_band = NUM_PERM // BANDS
    bsig = sig.reshape(nd, BANDS, per_band)
    bh = np.zeros((nd, BANDS), dtype=np.uint64)
    for r in range(per_band):
        bh = bh * np.uint64(0x100000001B3) + bsig[:, :, r]
    bh = _mix64(bh.reshape(-1)).reshape(nd, BANDS)
    bucket = bh ^ _BAND_SALTS[None, :]
    return pa.table(
        {
            "doc_id": pa.array(np.repeat(ids[ne], BANDS).astype(np.int64)),
            "bucket": pa.array(bucket.reshape(-1).view(np.int64)),
        }
    )


def shingle_sets(batch: pa.Table) -> pa.Table:
    """documents → (doc_id, shingles:binary) — the narrow per-doc
    shingle-set table that the distributed verify stage joins against.
    The set is the raw little-endian uint64 byte string (Arrow's hash
    join can't carry list<> payload columns; binary it can)."""
    h, doc_off = _flat_word_hashes(batch["text"])
    sh, sh_off = _doc_shingles(h, doc_off)
    byte_off = (sh_off * 8).astype(np.int32)
    ba = pa.Array.from_buffers(
        pa.binary(), len(batch),
        [None, pa.py_buffer(byte_off.tobytes()), pa.py_buffer(sh.tobytes())],
    )
    return pa.table({"doc_id": batch["doc_id"], "shingles": ba})


def _chunked_triu_pairs(ids: np.ndarray,
                        max_bucket: int = MAX_BUCKET) -> tuple[np.ndarray, np.ndarray]:
    """All (a<b) pairs of sorted ``ids``, chunked at ``max_bucket`` to
    bound a degenerate bucket's blowup at O(n·max_bucket) pairs."""
    if len(ids) <= max_bucket:
        ai, bi = np.triu_indices(len(ids), k=1)
        return ids[ai], ids[bi]
    outs_a, outs_b = [], []
    for i in range(0, len(ids), max_bucket):
        c = ids[i : i + max_bucket]
        ai, bi = np.triu_indices(len(c), k=1)
        outs_a.append(c[ai])
        outs_b.append(c[bi])
    return np.concatenate(outs_a), np.concatenate(outs_b)


def partitioned_buckets(exploded, key_cols, bucket_fn, num_parts: int = 64):
    """Run a per-bucket fn over every bucket WITHOUT a fine-grained
    groupby: hash-partition rows on the bucket key (the all-to-all sorts
    64 small ints instead of the full (band, hash) key space), then
    inside each partition lexsort once and slice bucket runs.

    Same outputs as ``groupby(key_cols).map_groups(bucket_fn)``; the
    cost moves from Ray's sort of the fine key to one cheap partition
    exchange — the shape every LSH pair stage here shares."""
    import pyarrow as _pa

    key_cols = list(key_cols)

    def part_fn(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_part"])
        if g.num_rows == 0:
            return bucket_fn(g)
        cols = [g[c].to_numpy() for c in key_cols]
        order = np.lexsort(tuple(reversed(cols)))
        gs = g.take(_pa.array(order))
        cs = [c[order] for c in cols]
        n = len(order)
        new = np.zeros(n, dtype=bool)
        new[0] = True
        for c in cs:
            new[1:] |= c[1:] != c[:-1]
        starts = np.nonzero(new)[0]
        ends = np.append(starts[1:], n)
        outs = [
            bucket_fn(gs.slice(s, e - s)) for s, e in zip(starts, ends) if e - s >= 2
        ]
        outs = [o for o in outs if len(o)]
        if not outs:
            return bucket_fn(gs.slice(0, 0))
        return _pa.concat_tables(outs)

    from engine.rayds.shuffle import hash_exchange_groups

    return hash_exchange_groups(exploded, key_cols, part_fn, num_parts)


def _bucket_pairs(max_bucket: int = MAX_BUCKET):
    """Within one band-salted bucket: doc pairs (a < b), capped."""

    def fn(group: pa.Table) -> pa.Table:
        ids = np.sort(group["doc_id"].to_numpy())
        if len(ids) < 2:
            return pa.table({"a": pa.array([], type=pa.int64()),
                             "b": pa.array([], type=pa.int64())})
        a, b = _chunked_triu_pairs(ids, max_bucket)
        return pa.table({"a": pa.array(a), "b": pa.array(b)})

    return fn


def minhash_candidate_pairs(docs_ds, max_bucket: int = MAX_BUCKET):
    """Dataset pipeline: explode → bucket groupby → pair generation →
    global pair dedupe (pairs that collide in several bands appear once).

    The pair dedupe uses the hash-shuffle plan: distinct-pair cardinality
    grows with the corpus, so a tree-reduce into one block would funnel
    every pair through a single task.
    """
    exploded = docs_ds.map_batches(
        minhash_batch, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
    pairs = partitioned_buckets(
        exploded, ("bucket",), _bucket_pairs(max_bucket)
    )
    from engine.rayds.shuffle import grouped_count

    return grouped_count(pairs, ["a", "b"], out_col="n_bands", use_shuffle=True)


def _list_to_flat(col) -> tuple[np.ndarray, np.ndarray]:
    """binary (uint64-bytes) column → (flat int64 values, offsets)."""
    arr = col
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    bo = arr.offset
    byte_off = np.frombuffer(arr.buffers()[1], dtype=np.int32)[bo : bo + n + 1].astype(
        np.int64
    )
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8) if byte_off[-1] > byte_off[0] else np.empty(0, np.uint8)
    flat = data[byte_off[0] : byte_off[-1]].view(np.int64)
    return flat, (byte_off - byte_off[0]) // 8


def _verify_pairs_batch(threshold: float):
    """Vectorized exact-Jaccard verify over (a, b, sh_a, sh_b) rows:
    intersection sizes for ALL pairs in the batch come from one lexsort
    over (pair_idx, value) — within a pair each side's values are unique,
    so cross-side duplicates ARE the intersection."""

    def fn(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy()
        b = batch["b"].to_numpy()
        va, offa = _list_to_flat(batch["sh_a"])
        vb, offb = _list_to_flat(batch["sh_b"])
        na = offa[1:] - offa[:-1]
        nb = offb[1:] - offb[:-1]
        npair = len(a)
        allv = np.concatenate([va, vb])
        allp = np.concatenate(
            [np.repeat(np.arange(npair, dtype=np.int64), na),
             np.repeat(np.arange(npair, dtype=np.int64), nb)]
        )
        order = np.lexsort((allv, allp))
        sv, sp = allv[order], allp[order]
        eq = np.zeros(len(sv), dtype=bool)
        if len(sv) > 1:
            eq[1:] = (sp[1:] == sp[:-1]) & (sv[1:] == sv[:-1])
        inter = np.bincount(sp[eq], minlength=npair) if len(sv) else np.zeros(npair, np.int64)
        union = na + nb - inter
        jac = np.where(union > 0, inter / np.maximum(union, 1), 0.0)
        keep = jac >= threshold
        return pa.table(
            {
                "a": pa.array(a[keep]),
                "b": pa.array(b[keep]),
                "jaccard": pa.array(jac[keep]),
            }
        )

    return fn


def _attach_group(group: pa.Table) -> pa.Table:
    """One hash partition of the pairs↔shingles cogroup: doc rows
    (shingles non-null) merged onto pair rows by ``np.searchsorted`` —
    a vectorized per-partition hash-join step (no per-row Python)."""
    is_doc = group["shingles"].is_valid()
    docs = group.filter(is_doc)
    prs = group.filter(pc.invert(is_doc))
    if len(prs) == 0 or len(docs) == 0:
        return pa.table(
            {"a": pa.array([], type=pa.int64()), "b": pa.array([], type=pa.int64()),
             "flip": pa.array([], type=pa.int64()),
             "sh": pa.array([], type=pa.binary())}
        )
    did = docs["doc_id"].to_numpy()
    order = np.argsort(did, kind="stable")
    did = did[order]
    want = prs["doc_id"].to_numpy()
    pos = np.searchsorted(did, want)
    pos = np.clip(pos, 0, len(did) - 1)
    hit = did[pos] == want
    take = pa.array(order[pos[hit]])
    keep = pa.array(np.nonzero(hit)[0])
    return pa.table(
        {
            "a": prs["a"].take(keep),
            "b": prs["b"].take(keep),
            "flip": prs["flip"].take(keep),
            "sh": docs["shingles"].take(take),
        }
    )


def _jaccard_group(threshold: float):
    """One hash partition of (a, b, flip, sh) rows — each pair has its
    flip=0 (side-a shingles) and flip=1 (side-b) rows co-located; sort by
    (a, b, flip), pair adjacent rows, verify vectorized."""

    def fn(group: pa.Table) -> pa.Table:
        a = group["a"].to_numpy()
        b = group["b"].to_numpy()
        flip = group["flip"].to_numpy()
        order = np.lexsort((flip, b, a))
        # dedupe (a, b, flip) — a pair colliding in several bands arrives
        # once per band; duplicates carry identical shingle bytes
        if len(order) > 1:
            sa, sb, sf = a[order], b[order], flip[order]
            keep = np.ones(len(order), dtype=bool)
            keep[1:] = (sa[1:] != sa[:-1]) | (sb[1:] != sb[:-1]) | (sf[1:] != sf[:-1])
            order = order[keep]
        if len(order) % 2 != 0:
            # a pair missing one side (doc absent) — drop the stragglers
            keep = np.ones(len(order), dtype=bool)
            sa, sb = a[order], b[order]
            same_next = np.zeros(len(order), dtype=bool)
            same_next[:-1] = (sa[:-1] == sa[1:]) & (sb[:-1] == sb[1:])
            same_prev = np.zeros(len(order), dtype=bool)
            same_prev[1:] = same_next[:-1]
            keep = same_next | same_prev
            order = order[keep]
        if len(order) == 0:
            return pa.table({"a": pa.array([], type=pa.int64()),
                             "b": pa.array([], type=pa.int64())})
        ev, od = order[0::2], order[1::2]
        sh = group["sh"]
        batch = pa.table(
            {
                "a": pa.array(a[ev]),
                "b": pa.array(b[ev]),
                "sh_a": sh.take(pa.array(ev)),
                "sh_b": sh.take(pa.array(od)),
            }
        )
        return _verify_pairs_batch(threshold)(batch).select(["a", "b"])

    return fn


BLOOM_MIN_CORPUS = 2_000_000  # docs; bloom pays once the corpus dwarfs pairs
PAIR_BROADCAST_MAX = 2_000_000  # pairs; budget for the broadcast-pairs plan


def _verify_broadcast_plan(docs_ds, pairs, threshold: float, P: int,
                           shingle_fn=None):
    """Verify plan for a candidate-pair table that fits a broadcast:
    the deduped (a, b) pairs (narrow: two int64s each) are indexed and
    shipped once via ``ray.put``; ONE map pass over the docs filters to
    candidate docs (searchsorted membership — cheaper than shingling),
    shingles them, and emits each doc's shingle bytes directly to its
    pairs' verify partitions; ONE exchange groups by pair-partition and
    verifies.  Collapses the cogroup plan's attach + verify exchanges
    into a single one (measured 7.1 s → ~3 s at sf0.1, where per-
    exchange fixed cost dominates)."""
    import ray

    # Ray skips empty blocks: zero candidate pairs yields zero batches,
    # and pa.concat_tables([]) raises — fall back to typed empties
    batches = list(pairs.iter_batches(batch_format="pyarrow"))
    pt = pa.concat_tables(batches) if batches else None
    a = (pt["a"].to_numpy() if pt is not None and pt.num_rows
         else np.empty(0, dtype=np.int64))
    b = (pt["b"].to_numpy() if pt is not None and pt.num_rows
         else np.empty(0, dtype=np.int64))
    order = np.lexsort((b, a))
    a, b = a[order], b[order]
    if len(a):
        keep = np.ones(len(a), dtype=bool)
        keep[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        a, b = a[keep], b[keep]
    ppart = ((a * np.int64(1000003)) ^ b) % P
    ob = np.argsort(b, kind="stable")
    ref = ray.put({"a": a, "b": b, "ppart": ppart,
                   "ob": ob, "b_sorted": b[ob]})

    def _ranges(sorted_keys: np.ndarray, want: np.ndarray):
        """Flat indices of every sorted_keys hit for each want value →
        (flat_idx, want_row_of_each) — vectorized range expansion."""
        lo = np.searchsorted(sorted_keys, want, side="left")
        hi = np.searchsorted(sorted_keys, want, side="right")
        cnt = hi - lo
        total = int(cnt.sum())
        if total == 0:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        starts = np.cumsum(cnt) - cnt
        flat = np.repeat(lo, cnt) + (
            np.arange(total, dtype=np.int64) - np.repeat(starts, cnt)
        )
        rows = np.repeat(np.arange(len(want), dtype=np.int64), cnt)
        return flat, rows

    def attach(batch: pa.Table) -> pa.Table:
        from engine.rayds.bcast import cached

        idx = cached(ref)
        did = batch["doc_id"].to_numpy()
        # membership prefilter BEFORE shingling: docs in no pair are free
        in_a = np.searchsorted(idx["a"], did, "right") > np.searchsorted(
            idx["a"], did, "left"
        )
        in_b = np.searchsorted(idx["b_sorted"], did, "right") > np.searchsorted(
            idx["b_sorted"], did, "left"
        )
        sel = np.nonzero(in_a | in_b)[0]
        if len(sel) == 0:
            return pa.table({"ppart": pa.array([], type=pa.int64()),
                             "a": pa.array([], type=pa.int64()),
                             "b": pa.array([], type=pa.int64()),
                             "flip": pa.array([], type=pa.int64()),
                             "sh": pa.array([], type=pa.binary())})
        cand = batch.take(pa.array(sel))
        t = (shingle_fn or shingle_sets)(cand)
        sh = t["shingles"]
        if isinstance(sh, pa.ChunkedArray):
            sh = sh.combine_chunks()
        cdid = t["doc_id"].to_numpy()
        fa, ra = _ranges(idx["a"], cdid)              # this doc is side a
        fb_s, rb = _ranges(idx["b_sorted"], cdid)     # this doc is side b
        fb = idx["ob"][fb_s]
        pidx = np.concatenate([fa, fb])
        rows = np.concatenate([ra, rb])
        flip = np.concatenate(
            [np.zeros(len(fa), dtype=np.int64), np.ones(len(fb), dtype=np.int64)]
        )
        return pa.table(
            {
                "ppart": pa.array(idx["ppart"][pidx]),
                "a": pa.array(idx["a"][pidx]),
                "b": pa.array(idx["b"][pidx]),
                "flip": pa.array(flip),
                "sh": sh.take(pa.array(rows)),
            }
        )

    attached = docs_ds.map_batches(
        attach, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
    from engine.rayds.shuffle import hash_exchange_fine_groups

    return hash_exchange_fine_groups(attached, ["ppart"],
                                     _jaccard_group(threshold))


def minhash_verified_pairs(docs_ds, threshold: float = 0.5,
                           num_partitions: int = 64,
                           bloom_prefilter: bool | None = None,
                           pair_broadcast_max: int = PAIR_BROADCAST_MAX,
                           explode_fn=None, bucket_keys=("bucket",),
                           pair_fn=None, shingle_fn=None):
    """MinHash candidates verified with EXACT n-gram Jaccard — fully
    distributed, two physical plans:

    - **Broadcast-pairs plan** (default whenever the candidate-pair
      table fits ``pair_broadcast_max``): the narrow (a, b) pair table
      is deduped, indexed and shipped once via ``ray.put``; one map
      pass over the docs routes candidate shingle sets straight to
      their pair's verify partition; ONE exchange verifies.  Candidate
      pairs are bucket-capped so this is the common case well past
      10^8 docs.
    - **Cogroup plan** (pair table past the broadcast budget): pairs
      cogroup with the per-doc shingle-set table in hash partitions
      (union → groupby(part) → vectorized searchsorted merge), then a
      second partition-wise pass pairs the two sides and verifies.
      ``bloom_prefilter`` (None = auto by corpus size) additionally
      filters the docs side through an OR-reduced Bloom bitmap of the
      candidate ids BEFORE shingling or shuffling — attach volume drops
      from O(corpus) to O(candidates + FP) with identical output.

    No driver-side materialization beyond the bounded pair table;
    every exchange moves narrow (ids + shingle-bytes) rows.

    (The cogroup is manual rather than ``Dataset.join``: Ray 2.49's
    hash join loses its schema broadcast when an input's first block is
    empty — common for join/groupby outputs — and crashes on chained
    joins.)"""
    P = num_partitions
    # RAW candidate pairs (band duplicates kept): the per-pair dedupe
    # aggregate would be a whole extra all-to-all — both verify plans
    # dedupe (a, b[, flip]) rows for free during their sorts
    exploded = docs_ds.map_batches(
        explode_fn or minhash_batch, batch_format="pyarrow",
        batch_size=None, zero_copy_batch=True
    )
    pairs = partitioned_buckets(
        exploded, bucket_keys, pair_fn or _bucket_pairs(MAX_BUCKET)
    )
    # bounded size probe: stream at most budget+1 pair rows; a prefix
    # within budget IS the whole pair table and is reused directly
    probe = pairs.limit(pair_broadcast_max + 1).materialize()
    if probe.count() <= pair_broadcast_max:
        return _verify_broadcast_plan(docs_ds, probe, threshold, P,
                                      shingle_fn=shingle_fn)
    if bloom_prefilter is None:
        try:  # parquet-metadata count; no execution for read→project plans
            bloom_prefilter = docs_ds.count() >= BLOOM_MIN_CORPUS
        except Exception:
            bloom_prefilter = False
    docs_side = docs_ds
    if bloom_prefilter:
        # Bloom semi-join: only candidate(-ish) docs get shingled+shuffled.
        import ray

        pairs = pairs.materialize()  # narrow (a, b) table, consumed twice
        bloom_ref = ray.put(pairs_bloom(pairs))
        docs_side = docs_ds.map_batches(
            make_bloom_filter_fn(bloom_ref),
            batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
        )
    shingled = docs_side.map_batches(
        shingle_fn or shingle_sets, batch_format="pyarrow",
        batch_size=None, zero_copy_batch=True
    )

    def explode_pairs(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy()
        b = batch["b"].to_numpy()
        doc = np.concatenate([a, b])
        flip = np.concatenate(
            [np.zeros(len(a), dtype=np.int64), np.ones(len(b), dtype=np.int64)]
        )
        return pa.table(
            {
                "part": pa.array(doc % P),
                "doc_id": pa.array(doc),
                "a": pa.array(np.concatenate([a, a])),
                "b": pa.array(np.concatenate([b, b])),
                "flip": pa.array(flip),
                "shingles": pa.nulls(2 * len(a), type=pa.binary()),
            }
        )

    def tag_docs(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].to_numpy()
        n = len(batch)
        return pa.table(
            {
                "part": pa.array(did % P),
                "doc_id": batch["doc_id"],
                "a": pa.nulls(n, type=pa.int64()),
                "b": pa.nulls(n, type=pa.int64()),
                "flip": pa.nulls(n, type=pa.int64()),
                "shingles": batch["shingles"],
            }
        )

    side = pairs.map_batches(explode_pairs, batch_format="pyarrow", batch_size=None)
    docs_tagged = shingled.map_batches(tag_docs, batch_format="pyarrow", batch_size=None)
    from engine.rayds.shuffle import hash_exchange_fine_groups

    attached = hash_exchange_fine_groups(side.union(docs_tagged), ["part"],
                                         _attach_group)

    def pair_part(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy()
        b = batch["b"].to_numpy()
        return batch.append_column(
            "ppart", pa.array(((a * np.int64(1000003)) ^ b) % P)
        )

    keyed = attached.map_batches(pair_part, batch_format="pyarrow", batch_size=None)
    return hash_exchange_fine_groups(keyed, ["ppart"],
                                     _jaccard_group(threshold))


def consecutive_jaccard(docs_ds, num_partitions: int = 64):
    """Exact word-3-gram Jaccard for every consecutive doc pair
    (doc_id, doc_id+1) — the SQL-oracle-checkable form of the verify
    kernel (reference semantics: shapely has no text ops; this is the
    engine-level dedup addition from the task brief).

    Scale shape: ONE shuffle.  Each doc's shingle-set bytes are emitted
    twice — to pair key ``doc_id`` as side a and ``doc_id-1`` as side
    b — then hash-partitioned on the pair key and verified per
    partition with the same vectorized lexsort-intersection kernel the
    MinHash verify stage uses.  No join, no driver materialization;
    pairs missing a side (the last doc) drop out in the group stage.
    """
    P = num_partitions

    def explode(batch: pa.Table) -> pa.Table:
        t = shingle_sets(batch)
        did = t["doc_id"].to_numpy()
        sh = t["shingles"]
        if isinstance(sh, pa.ChunkedArray):
            sh = sh.combine_chunks()
        pair = np.concatenate([did, did - 1])
        flip = np.concatenate(
            [np.zeros(len(did), dtype=np.int64), np.ones(len(did), dtype=np.int64)]
        )
        out = pa.table(
            {
                "part": pa.array(pair % P),
                "pair": pa.array(pair),
                "flip": pa.array(flip),
                "sh": pa.concat_arrays([sh, sh]),
            }
        )
        return out.filter(pc.field("pair") >= 0)

    def group_fn(group: pa.Table) -> pa.Table:
        p = group["pair"].to_numpy()
        f = group["flip"].to_numpy()
        order = np.lexsort((f, p))
        ps = p[order]
        # complete pairs = adjacent equal pair keys (each (pair, flip)
        # occurs at most once: doc_ids are unique)
        first = np.zeros(len(ps), dtype=bool)
        if len(ps) > 1:
            first[:-1] = ps[:-1] == ps[1:]
        ev = order[first]
        od = order[np.roll(first, 1)]
        sh = group["sh"]
        batch = pa.table(
            {
                "a": pa.array(p[ev]),
                "b": pa.array(p[ev] + 1),
                "sh_a": sh.take(pa.array(ev)),
                "sh_b": sh.take(pa.array(od)),
            }
        )
        return _verify_pairs_batch(0.0)(batch)

    exploded = docs_ds.map_batches(
        explode, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
    from engine.rayds.shuffle import hash_exchange_fine_groups

    return hash_exchange_fine_groups(exploded, ["part"], group_fn)


def jaccard_verify(pairs_tbl: pa.Table, texts_by_id: dict[int, str],
                   threshold: float = 0.5) -> pa.Table:
    """Exact word-3-gram Jaccard for candidate pairs — kernel-level form
    over an in-memory pair table + text lookup (the distributed form is
    ``minhash_verified_pairs``)."""
    a = pairs_tbl["a"].to_numpy()
    b = pairs_tbl["b"].to_numpy()
    jac = np.zeros(len(a))
    for i in range(len(a)):
        sa = set(_shingles(texts_by_id[int(a[i])]).tolist())
        sb = set(_shingles(texts_by_id[int(b[i])]).tolist())
        denom = len(sa | sb)
        jac[i] = (len(sa & sb) / denom) if denom else 0.0
    keep = jac >= threshold
    return pa.table(
        {
            "a": pa.array(a[keep]),
            "b": pa.array(b[keep]),
            "jaccard": pa.array(jac[keep]),
        }
    )


# ----------------------------------------------------------------- simhash
def simhash_batch(batch: pa.Table) -> pa.Table:
    """+ simhash:int64 — 64-bit sign-aggregated token-hash fingerprint.

    Vectorized: token hashes from the flat string buffer, bit matrix via
    ``np.unpackbits``, per-doc bit votes via ``np.add.reduceat``."""
    h, doc_off = _flat_word_hashes(batch["text"])
    n_docs = len(doc_off) - 1
    out = np.zeros(n_docs, dtype=np.uint64)
    if len(h):
        nw = (doc_off[1:] - doc_off[:-1]).astype(np.int64)
        # int32 bit matrix: wide enough for any per-doc vote sum, 2× the
        # uint8 footprint (bounded by batch_size), and lets reduceat run
        # its fast same-dtype path (the dtype=int64 upcast variant is
        # ~60× slower in numpy)
        bits = np.unpackbits(
            h.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
        ).astype(np.int32)
        idx = np.minimum(doc_off[:-1], len(h) - 1)
        sums = np.add.reduceat(bits, idx, axis=0).astype(np.int64)
        votes = 2 * sums - nw[:, None]
        packed = np.packbits((votes > 0).astype(np.uint8), axis=1, bitorder="little")
        out = np.ascontiguousarray(packed).view(np.uint64).ravel().copy()
        out[nw == 0] = 0
    return batch.append_column("simhash", pa.array(out.view(np.int64)))


def simhash_band_cols(batch: pa.Table) -> pa.Table:
    """+ sh_band0..3: 16-bit chunks — Hamming-≤3 pairs share ≥1 band
    (pigeonhole), making near-dup search a 4-way equi-join."""
    sh = batch["simhash"].to_numpy().view(np.uint64)
    t = batch
    for b in range(4):
        t = t.append_column(
            f"sh_band{b}", pa.array(((sh >> np.uint64(16 * b)) & np.uint64(0xFFFF)).view(np.int64))
        )
    return t


def _simhash_explode(batch: pa.Table) -> pa.Table:
    """(doc_id, simhash) → 4 rows (bucket, doc_id, simhash); the 2-bit
    band index and 16-bit band value pack exactly into one int64 bucket
    key (band_idx<<16 | band_val) — one key column through the
    exchange, zero collision risk."""
    sh = batch["simhash"].to_numpy().view(np.uint64)
    ids = batch["doc_id"].to_numpy()
    n = len(ids)
    bucket = np.concatenate(
        [
            (np.int64(b) << np.int64(16))
            | ((sh >> np.uint64(16 * b)) & np.uint64(0xFFFF)).view(np.int64)
            for b in range(4)
        ]
    )
    return pa.table(
        {
            "bucket": pa.array(bucket),
            "doc_id": pa.array(np.tile(ids, 4)),
            "simhash": pa.array(np.tile(sh.view(np.int64), 4)),
        }
    )


_POPCNT_LUT = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(axis=1)


def _simhash_bucket_pairs(max_ham: int):
    def fn(group: pa.Table) -> pa.Table:
        ids = group["doc_id"].to_numpy()
        sh = group["simhash"].to_numpy().view(np.uint64)
        order = np.argsort(ids, kind="stable")
        ids, sh = ids[order], sh[order]
        if len(ids) < 2:
            return pa.table(
                {"a": pa.array([], type=pa.int64()), "b": pa.array([], type=pa.int64()),
                 "hamming": pa.array([], type=pa.int64())}
            )
        outs = []
        for i in range(0, len(ids), MAX_BUCKET):
            cid, csh = ids[i : i + MAX_BUCKET], sh[i : i + MAX_BUCKET]
            if len(cid) < 2:
                continue
            ai, bi = np.triu_indices(len(cid), k=1)
            x = csh[ai] ^ csh[bi]
            ham = _POPCNT_LUT[x.view(np.uint8).reshape(len(x), 8)].sum(axis=1).astype(np.int64)
            keep = ham <= max_ham
            outs.append((cid[ai][keep], cid[bi][keep], ham[keep]))
        if not outs:
            return pa.table(
                {"a": pa.array([], type=pa.int64()), "b": pa.array([], type=pa.int64()),
                 "hamming": pa.array([], type=pa.int64())}
            )
        return pa.table(
            {"a": pa.array(np.concatenate([o[0] for o in outs])),
             "b": pa.array(np.concatenate([o[1] for o in outs])),
             "hamming": pa.array(np.concatenate([o[2] for o in outs]))}
        )

    return fn


def hash_near_pairs(hashed_ds, id_col: str = "doc_id",
                    hash_col: str = "simhash", max_ham: int = 8):
    """Near-dup pairs of ANY 64-bit fingerprint column by banded
    Hamming LSH — the generic core shared by text SimHash and image
    perceptual-hash (phash) dedup.

    16-bit band explode → bucket cogroup (one exchange) → in-bucket
    vectorized XOR-popcount verify → global pair dedupe (min hamming
    per pair).  By pigeonhole, pairs with hamming ≤ 3 ALWAYS share at
    least one of the 4 bands, so recall is EXACT for ``max_ham ≤ 3``;
    larger thresholds trade recall for the same bounded cost (the
    standard LSH contract, pinned by the recall tests)."""

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_id": batch[id_col],
                         "simhash": batch[hash_col]})

    prepped = hashed_ds.select_columns(
        list(dict.fromkeys([id_col, hash_col]))
    ).map_batches(rename, batch_format="pyarrow", batch_size=None)
    exploded = prepped.map_batches(
        _simhash_explode, batch_format="pyarrow", batch_size=None
    )
    pairs = partitioned_buckets(
        exploded, ("bucket",), _simhash_bucket_pairs(max_ham)
    )
    # pair dedupe (min hamming per pair) via the engine's own hash
    # shuffle — Ray's groupby().min Aggregate costs ~20 s fixed overhead
    from engine.rayds.shuffle import hash_shuffle_agg

    return hash_shuffle_agg(
        pairs, ["a", "b"], [("hamming", "min")], ["hamming"]
    )


def simhash_near_pairs(docs_ds, max_ham: int = 8):
    """SimHash near-dup pipeline: hash → banded-Hamming LSH core
    (``hash_near_pairs``)."""
    # bounded batches: the bit matrix is n_words×64 bytes — 2048 docs of
    # ~500 words ≈ 64 MB per batch, safely inside a worker heap
    hashed = docs_ds.map_batches(simhash_batch, batch_format="pyarrow",
                                 batch_size=2048, zero_copy_batch=True)
    return hash_near_pairs(hashed, "doc_id", "simhash", max_ham)


# ------------------------------------------------------- embedding near-dup
def _emb_matrix(col) -> np.ndarray:
    """list<float> column → (n, dim) float64 matrix, zero-copy from the
    Arrow list value buffer (no per-row to_pylist)."""
    arr = col
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    vals = pc.list_flatten(arr)
    if isinstance(vals, pa.ChunkedArray):
        vals = vals.combine_chunks()
    flat = vals.to_numpy().astype(np.float64, copy=False)
    n = len(arr)
    if n == 0:
        return np.zeros((0, 0))
    return flat.reshape(n, len(flat) // n)


def _pair_group_sims(group: pa.Table, threshold: float) -> pa.Table:
    """One block-pair group: matmul the two member blocks, emit (a<b)
    pairs with round(cos, 6) ≥ threshold."""
    ids = group["vec_id"].to_numpy()
    side = group["_side"].to_numpy()
    emb = _emb_matrix(group["embedding"])
    norms = np.linalg.norm(emb, axis=1)
    norms[norms == 0] = 1.0
    unit = emb / norms[:, None]
    left = side == 0
    same_block = bool((~left).sum() == 0)
    if same_block:
        sims = unit @ unit.T
        ai, bi = np.nonzero(np.round(sims, 6) >= threshold)
        a_ids, b_ids = ids[ai], ids[bi]
        keep = a_ids < b_ids  # each unordered pair appears twice; keep one
        a_ids, b_ids = a_ids[keep], b_ids[keep]
    else:
        ul, ur = unit[left], unit[~left]
        il, ir = ids[left], ids[~left]
        sims = ul @ ur.T
        ai, bi = np.nonzero(np.round(sims, 6) >= threshold)
        a_ids, b_ids = il[ai], ir[bi]
        # blocks don't order ids — normalize each (unique) cross pair
        a_ids, b_ids = np.minimum(a_ids, b_ids), np.maximum(a_ids, b_ids)
    return pa.table({"a": pa.array(a_ids), "b": pa.array(b_ids)})


def embed_dedup_pairs(ds, threshold: float, num_blocks: int = 8):
    """EXACT cosine-threshold self-join, distributed as block pairs.

    Each vector is assigned block b = vec_id mod P and replicated into
    the P unordered block-pair groups (min(b,p), max(b,p)); each group
    is one vectorized matmul task over its two member blocks.  Work is
    the unavoidable O(N²) of an exact dense similarity join but split
    across P(P+1)/2 independent tasks with O(N/P) memory each —
    no driver materialization, no full-matrix broadcast.  (The
    approximate scale path is LSH bucketing via ``ann.make_planes``;
    exact recall can't ride LSH, so the exact query uses this plan.)
    """
    P = num_blocks

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy()
        emb = batch["embedding"]
        blk = (ids % P).astype(np.int64)
        tabs = []
        for p in range(P):
            lo = np.minimum(blk, p)
            hi = np.maximum(blk, p)
            g = lo * P + hi
            side = (blk != lo).astype(np.int64)  # 0 = low block, 1 = high
            tabs.append(
                pa.table(
                    {
                        "g": pa.array(g),
                        "_side": pa.array(side),
                        "vec_id": batch["vec_id"],
                        "embedding": emb,
                    }
                )
            )
        return pa.concat_tables(tabs)

    exploded = ds.map_batches(explode, batch_format="pyarrow", batch_size=None,
                              zero_copy_batch=True)

    def group_fn(group: pa.Table) -> pa.Table:
        return _pair_group_sims(group, threshold)

    from engine.rayds.shuffle import hash_exchange_fine_groups

    return hash_exchange_fine_groups(exploded, ["g"], group_fn)


class EmbeddingDedup:
    """Actor stage: per-batch cosine vs a broadcast matrix (kept for the
    SMALL-side case where one side genuinely fits an object-store ref;
    the self-join query path is ``embed_dedup_pairs``)."""

    def __init__(self, mat_ref, ids_ref, threshold: float):
        import ray

        self.mat = ray.get(mat_ref) if isinstance(mat_ref, ray.ObjectRef) else mat_ref
        self.ids = ray.get(ids_ref) if isinstance(ids_ref, ray.ObjectRef) else ids_ref
        norms = np.linalg.norm(self.mat, axis=1)
        norms[norms == 0] = 1.0
        self.unit = self.mat / norms[:, None]
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy()
        emb = _emb_matrix(batch["embedding"])
        norms = np.linalg.norm(emb, axis=1)
        norms[norms == 0] = 1.0
        sims = (emb / norms[:, None]) @ self.unit.T
        ai, bi = np.nonzero(np.round(sims, 6) >= self.threshold)
        a_ids, b_ids = ids[ai], self.ids[bi]
        keep = a_ids < b_ids
        return pa.table({"a": pa.array(a_ids[keep]), "b": pa.array(b_ids[keep])})


def embed_dedup_lsh(ds, threshold: float, nbits: int = 8, dim: int = 64,
                    seed: int = 7):
    """APPROXIMATE cosine near-dup: hyperplane-LSH bucket groupby +
    in-bucket exact verify (recall < 1 — the 100-TB path; the exact
    block-pair plan is ``embed_dedup_pairs``).  Buckets are capped at
    MAX_BUCKET via chunked pair generation."""
    from engine.ops.ann import make_planes

    planes = make_planes(dim, nbits, seed)

    def bucketize(batch: pa.Table) -> pa.Table:
        emb = _emb_matrix(batch["embedding"])
        signs = (emb @ planes.T) > 0
        bucket = np.zeros(len(emb), dtype=np.int64)
        for b in range(signs.shape[1]):
            bucket |= signs[:, b].astype(np.int64) << b
        return pa.table(
            {"bucket": pa.array(bucket), "vec_id": batch["vec_id"],
             "embedding": batch["embedding"]}
        )

    bucketed = ds.map_batches(bucketize, batch_format="pyarrow", batch_size=None,
                              zero_copy_batch=True)

    def group_fn(group: pa.Table) -> pa.Table:
        ids = group["vec_id"].to_numpy()
        emb = _emb_matrix(group["embedding"])
        if len(ids) < 2:
            return pa.table({"a": pa.array([], type=pa.int64()),
                             "b": pa.array([], type=pa.int64())})
        norms = np.linalg.norm(emb, axis=1)
        norms[norms == 0] = 1.0
        unit = emb / norms[:, None]
        outs_a, outs_b = [], []
        order = np.argsort(ids, kind="stable")
        ids, unit = ids[order], unit[order]
        for i in range(0, len(ids), MAX_BUCKET):
            cid, cu = ids[i : i + MAX_BUCKET], unit[i : i + MAX_BUCKET]
            sims = cu @ cu.T
            ai, bi = np.nonzero(np.round(sims, 6) >= threshold)
            keep = cid[ai] < cid[bi]
            outs_a.append(cid[ai][keep])
            outs_b.append(cid[bi][keep])
        return pa.table(
            {"a": pa.array(np.concatenate(outs_a)),
             "b": pa.array(np.concatenate(outs_b))}
        )

    from engine.rayds.shuffle import hash_exchange_fine_groups

    return hash_exchange_fine_groups(bucketed, ["bucket"], group_fn)


def prefix_shadowed_ids(ds, text_col: str = "text", id_col: str = "doc_id"):
    """PREFIX-DEDUP (the sorted-adjacency form of suffix-array exact
    substring dedup, restricted to whole-document prefixes): return the
    ids of documents that are *shadowed* — their text is an exact
    duplicate of a lower-id document, or a strict prefix of some other
    document (keep-the-longest / keep-the-lowest-id policy).

    Plan (scale shape): ONE Ray native range sort on (text, id) — in
    lexicographic order, ``t`` is a prefix of ANY later string iff it is
    a prefix of its immediate next-distinct successor, so shadowing is
    decidable from adjacent rows.  Per sorted block, flags are computed
    vectorized; block boundaries stitch through ≤3 boundary strings per
    block collected on the driver (first text, first text differing
    from it, last text — enough to resolve runs that span blocks), so
    driver traffic is O(blocks · max_doc_len), never O(rows).

    No reference analog (shapely has no text ops); this is the
    data-pipeline dedup family member next to minhash/simhash.
    """
    import pyarrow.compute as pc
    import ray
    import ray.data

    srt = ds.select_columns([id_col, text_col]).sort(
        [text_col, id_col]).materialize()
    refs = srt.to_arrow_refs()

    @ray.remote
    def _meta(tbl: pa.Table):
        n = tbl.num_rows
        if n == 0:
            return (None, None, None)
        col = tbl.column(text_col)
        first = col[0].as_py()
        last = col[n - 1].as_py()
        second = None
        if first != last:
            idx = pc.index(pc.not_equal(col, first), True).as_py()
            second = col[idx].as_py()
        return (first, second, last)

    metas = ray.get([_meta.remote(r) for r in refs])
    nonempty = [j for j, m in enumerate(metas) if m[0] is not None]

    # boundary resolution: for block j, the text immediately before its
    # first row, and the first text AFTER the block that differs from
    # its last row's text (walk skips blocks made entirely of that text)
    prev_last: dict[int, str | None] = {}
    next_diff: dict[int, str | None] = {}
    for pos, j in enumerate(nonempty):
        prev_last[j] = metas[nonempty[pos - 1]][2] if pos > 0 else None
        t_last = metas[j][2]
        nd = None
        for k in nonempty[pos + 1:]:
            f, s, _l = metas[k]
            if f != t_last:
                nd = f
                break
            if s is not None:
                nd = s
                break
        next_diff[j] = nd

    CHUNK = 4096  # bounds the U-dtype copy in the startswith check

    @ray.remote
    def _flags(tbl: pa.Table, prev_txt, next_txt) -> pa.Table:
        n = tbl.num_rows
        if n == 0:
            return pa.table({id_col: pa.array([], type=pa.int64())})
        col = tbl.column(text_col).combine_chunks()
        # prev-equal: an equal-text row with a smaller id exists
        prev_eq = np.zeros(n, dtype=bool)
        if n > 1:
            prev_eq[1:] = pc.equal(
                col.slice(1), col.slice(0, n - 1)).to_numpy(
                zero_copy_only=False)
        if prev_txt is not None:
            prev_eq[0] = col[0].as_py() == prev_txt
        # run-first rows: strict-prefix test against the run's
        # next-distinct text (runs of equal texts are adjacent)
        change = np.flatnonzero(~prev_eq)  # run starts (row 0 unless its
        # run continues from the previous block)
        run_end = np.empty(len(change), dtype=np.int64)
        if len(change):
            run_end[:-1] = change[1:] - 1
            run_end[-1] = n - 1
        texts = col.to_numpy(zero_copy_only=False)
        shadowed = prev_eq.copy()
        for lo in range(0, len(change), CHUNK):
            ci = change[lo:lo + CHUNK]
            ei = run_end[lo:lo + CHUNK]
            cur = texts[ci]
            nxt = np.empty(len(ci), dtype=object)
            inb = ei + 1 < n
            nxt[inb] = texts[ei[inb] + 1]
            if not inb.all():
                if next_txt is None:
                    # nothing after: those run-firsts can't be prefixes
                    keep = inb
                    ci, cur, nxt = ci[keep], cur[keep], nxt[keep]
                else:
                    nxt[~inb] = next_txt
            if len(ci) == 0:
                continue
            cu = cur.astype("U")
            nu = nxt.astype("U")
            lens_c = np.char.str_len(cu)
            lens_n = np.char.str_len(nu)
            is_pre = np.char.startswith(nu, cu) & (lens_n > lens_c)
            shadowed[ci[is_pre]] = True
        out = tbl.column(id_col).filter(pa.array(shadowed))
        return pa.table({id_col: out.cast(pa.int64())})

    out_refs = [
        _flags.remote(refs[j], prev_last[j], next_diff[j]) for j in nonempty
    ]
    empty = pa.table({id_col: pa.array([], type=pa.int64())})
    if not out_refs:
        return empty
    out = ray.data.from_arrow_refs(out_refs)
    if out.count() == 0:
        # Ray 2.49 drops the column schema of an all-empty Dataset in
        # to_pandas(); the blocks are already materialized, so the count
        # is metadata-cheap — hand back a typed driver-side table
        return empty
    return out


# ------------------------------------------------------ md5 LSH (SQL-checkable)
#
# A second MinHash+LSH / SimHash family whose every hash is the MD5
# top-64 (`vhash.md5_u64` == DuckDB's md5() prefix cast), so the ENTIRE
# candidate-generation pipeline — tokenize, shingle, permute, band,
# bucket — is reproducible as a SQL oracle.  The driver-facing
# `minhash_pairs` / `minhash_verified` / `simhash_pairs` queries run
# this family; the integer-mix family above remains the cheaper scale
# path (recall-pinned in pytest).  Bucket groups are LOUD-guarded
# instead of capped: the SQL mirror has no cap, so a silently-capped
# bucket would diverge — past `LOUD_BUCKET` members the query raises.

US = "\x1f"  # shingle joiner (chr(31) in SQL); never appears in testdata text
NUM_PERM_MD5 = 16
BANDS_MD5 = 4  # 4 bands × 4 rows ≈ threshold ~0.71 Jaccard

# Permutations are AFFINE maps over one md5 per window (h·A_p + B_p mod
# 2^64, A_p odd ⇒ bijective) instead of 16 separate md5 passes — 16×
# less hashing with identical LSH semantics, and the affine form is
# exactly expressible in SQL (HUGEINT-emulated wrapping arithmetic).
# Deterministic constants derived from md5 so both sides share one
# source of truth (__ray_entry__ inlines these numbers into the oracle).


def _perm_consts():
    import hashlib

    a, b = [], []
    for p in range(NUM_PERM_MD5):
        a.append(int(hashlib.md5(f"perm-a-{p}".encode()).hexdigest()[:16], 16) | 1)
        b.append(int(hashlib.md5(f"perm-b-{p}".encode()).hexdigest()[:16], 16))
    return (np.array(a, dtype=np.uint64), np.array(b, dtype=np.uint64))


MINHASH_MD5_A, MINHASH_MD5_B = _perm_consts()
SIMHASH_BANDS = 8  # 8 bands × 8 bits; max_ham ≤ 7 ⇒ pigeonhole recall = 1
LOUD_BUCKET = 8192


def _md5_windows(batch: pa.Table, k: int = SHINGLE_K):
    """Per-doc k-word windows as STRINGS (DuckDB-mirrorable shingles).

    Tokenization = split on single spaces, empties kept (DuckDB
    ``string_split(text, ' ')`` parity).  Docs with < k words emit ONE
    window = the whole text with spaces replaced by the joiner
    (== ``array_to_string(words, chr(31))``).  Returns ``(windows,
    doc_rows)`` — a string array plus the batch row index of each
    window's doc.  Fully vectorized (shifted takes + element-wise join).
    """
    texts = batch["text"]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    words = pc.split_pattern(texts, " ")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    off0 = words.offsets.to_numpy().astype(np.int64)
    doc_off = off0 - off0[0]
    flat = pc.list_flatten(words)
    nw = doc_off[1:] - doc_off[:-1]
    long_rows = np.nonzero(nw >= k)[0]
    short_rows = np.nonzero(nw < k)[0]
    if texts.null_count:
        # SQL NULL parity: md5(NULL) is NULL in DuckDB, so null-text
        # docs emit NO windows (they'd otherwise hash as empty strings
        # and diverge from the oracle).  Nulls have nw == 0, so only
        # the short-row path can see them.
        valid = pc.is_valid(texts).to_numpy(zero_copy_only=False)
        short_rows = short_rows[valid[short_rows]]
    parts_w: list = []
    parts_d: list = []
    if len(long_rows):
        nwin = nw[long_rows] - k + 1
        total = int(nwin.sum())
        rep = np.repeat(long_rows, nwin)
        starts = np.repeat(doc_off[long_rows], nwin) + (
            np.arange(total, dtype=np.int64)
            - np.repeat(np.cumsum(nwin) - nwin, nwin)
        )
        cols = [flat.take(pa.array(starts + j)) for j in range(k)]
        win = pc.binary_join_element_wise(*cols, US)
        parts_w.append(win)
        parts_d.append(rep)
    if len(short_rows):
        joined = pc.replace_substring(
            texts.take(pa.array(short_rows)), " ", US
        )
        parts_w.append(joined)
        parts_d.append(short_rows)
    if not parts_w:
        return pa.array([], type=pa.string()), np.empty(0, dtype=np.int64)
    win = pa.concat_arrays([p.combine_chunks() if isinstance(p, pa.ChunkedArray)
                            else p for p in parts_w])
    doc_rows = np.concatenate(parts_d)
    return win, doc_rows


def _distinct_windows(batch: pa.Table, k: int = SHINGLE_K):
    """(windows, doc_rows) deduped per doc (by md5-u64; grouped by doc).

    Returns (win_arr, doc_rows, hashes) sorted by (doc, hash)."""
    from engine.ops.vhash import md5_u64

    win, doc_rows = _md5_windows(batch, k)
    h = md5_u64(win)
    order = np.lexsort((h, doc_rows))
    hs, ds = h[order], doc_rows[order]
    keep = np.ones(len(hs), dtype=bool)
    if len(hs) > 1:
        keep[1:] = (ds[1:] != ds[:-1]) | (hs[1:] != hs[:-1])
    sel = order[keep]
    return win.take(pa.array(sel)), doc_rows[sel], h[sel]


def minhash_md5_batch(batch: pa.Table) -> pa.Table:
    """documents → (doc_id, band, bucket): the SQL-mirrorable LSH
    explode.  base = md5_u64(window) once per distinct window;
    sig[d,p] = min over d's windows of (base·A_p + B_p mod 2^64);
    bucket = md5_u64(band || ':' || sig values joined by ',').  One row
    per (doc, band)."""
    from engine.ops.vhash import md5_u64

    ids = batch["doc_id"].to_numpy()
    _win, doc_rows, h = _distinct_windows(batch)
    if len(doc_rows) == 0:
        return pa.table({"doc_id": pa.array([], type=pa.int64()),
                         "band": pa.array([], type=pa.int64()),
                         "bucket": pa.array([], type=pa.int64())})
    present, seg_starts = np.unique(doc_rows, return_index=True)
    nd = len(present)
    sig = np.empty((nd, NUM_PERM_MD5), dtype=np.uint64)
    for p in range(NUM_PERM_MD5):
        hp = h * MINHASH_MD5_A[p] + MINHASH_MD5_B[p]
        sig[:, p] = np.minimum.reduceat(hp, seg_starts)
    r = NUM_PERM_MD5 // BANDS_MD5
    out_doc, out_band, out_bucket = [], [], []
    for b in range(BANDS_MD5):
        pieces = [pa.array(sig[:, b * r + j]).cast(pa.string())
                  for j in range(r)]
        body = pc.binary_join_element_wise(*pieces, ",")
        keyed = pc.binary_join_element_wise(f"{b}:", body, "")
        bucket = md5_u64(keyed).view(np.int64)
        out_doc.append(ids[present].astype(np.int64))
        out_band.append(np.full(nd, b, dtype=np.int64))
        out_bucket.append(bucket)
    return pa.table(
        {
            "doc_id": pa.array(np.concatenate(out_doc)),
            "band": pa.array(np.concatenate(out_band)),
            "bucket": pa.array(np.concatenate(out_bucket)),
        }
    )


def shingle_sets_md5(batch: pa.Table) -> pa.Table:
    """documents → (doc_id, shingles:binary) with md5-u64 window hashes
    (same wire format as ``shingle_sets``, so both verify plans apply)."""
    _win, doc_rows, h = _distinct_windows(batch)
    n = len(batch)
    counts = np.bincount(doc_rows, minlength=n)
    sh_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=sh_off[1:])
    byte_off = (sh_off * 8).astype(np.int32)
    ba = pa.Array.from_buffers(
        pa.binary(), n,
        [None, pa.py_buffer(byte_off.tobytes()),
         pa.py_buffer(h.view(np.int64).tobytes())],
    )
    return pa.table({"doc_id": batch["doc_id"], "shingles": ba})


def _bucket_pairs_loud(limit: int = LOUD_BUCKET):
    """All (a<b) pairs of one bucket; RAISES past ``limit`` members
    (the SQL mirror has no cap — a silent cap would diverge)."""

    def fn(group: pa.Table) -> pa.Table:
        ids = np.sort(group["doc_id"].to_numpy())
        if len(ids) < 2:
            return pa.table({"a": pa.array([], type=pa.int64()),
                             "b": pa.array([], type=pa.int64())})
        if len(ids) > limit:
            raise RuntimeError(
                f"LSH bucket of {len(ids)} members exceeds the loud guard "
                f"({limit}); shrink bands or pre-split the corpus"
            )
        ai, bi = np.triu_indices(len(ids), k=1)
        return pa.table({"a": pa.array(ids[ai]), "b": pa.array(ids[bi])})

    return fn


def minhash_candidate_pairs_md5(docs_ds):
    """md5-LSH candidate pairs with per-pair band counts — bit-exact
    against the DuckDB mirror of the same tokenize→shingle→permute→
    band→bucket chain."""
    from engine.rayds.shuffle import grouped_count

    exploded = docs_ds.map_batches(
        minhash_md5_batch, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True,
    )
    pairs = partitioned_buckets(
        exploded, ("band", "bucket"), _bucket_pairs_loud()
    )
    return grouped_count(pairs, ["a", "b"], out_col="n_bands", use_shuffle=True)


def simhash_md5_batch(batch: pa.Table) -> pa.Table:
    """documents → (doc_id, band, val, fp): md5-token SimHash.

    fp = 64-bit fingerprint (bit j set iff Σ_tokens ±1 of md5-u64 bit j
    is > 0, duplicates counted); val = fp's 8-bit band slice.  fp rides
    along so the bucket stage computes exact Hamming locally (no second
    join)."""
    from engine.ops.vhash import md5_u64

    if batch["text"].null_count:
        # SQL NULL parity (md5(NULL) is NULL): null-text docs drop out
        # of the explode entirely instead of fingerprinting as 0
        batch = batch.filter(pc.is_valid(batch["text"]))
    ids = batch["doc_id"].to_numpy()
    texts = batch["text"]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    words = pc.split_pattern(texts, " ")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    off0 = words.offsets.to_numpy().astype(np.int64)
    doc_off = off0 - off0[0]
    flat = pc.list_flatten(words)
    h = md5_u64(flat)
    n = len(batch)
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
            & np.uint64(1)).astype(np.int32) * 2 - 1
    # reduceat ONLY over docs with ≥1 token: their start offsets are
    # all < len(h) (no IndexError for trailing zero-token docs), each
    # segment runs to the next nonzero doc's start (zero-token docs
    # contribute no rows), and zero-token docs get an explicit zero
    # count — no clamp that could silently truncate a neighbor's
    # segment
    nw = doc_off[1:] - doc_off[:-1]
    nz = nw > 0
    cnt = np.zeros((n, 64), dtype=np.int32)
    if len(h) and nz.any():
        cnt[nz] = np.add.reduceat(bits, doc_off[:-1][nz], axis=0)
    fpbits = (cnt > 0)
    fp = (fpbits.astype(np.uint64)
          @ (np.uint64(1) << np.arange(64, dtype=np.uint64))).view(np.int64)
    band_vals = np.empty((n, SIMHASH_BANDS), dtype=np.int64)
    for b in range(SIMHASH_BANDS):
        band_vals[:, b] = (
            fpbits[:, b * 8:(b + 1) * 8].astype(np.int64)
            @ (1 << np.arange(8, dtype=np.int64))
        )
    rep = np.repeat(np.arange(n, dtype=np.int64), SIMHASH_BANDS)
    return pa.table(
        {
            "doc_id": pa.array(np.repeat(ids.astype(np.int64), SIMHASH_BANDS)),
            "band": pa.array(np.tile(np.arange(SIMHASH_BANDS, dtype=np.int64), n)),
            "val": pa.array(band_vals.reshape(-1)),
            "fp": pa.array(np.repeat(fp, SIMHASH_BANDS)),
        }
    )


def simhash_pairs_md5(docs_ds, max_ham: int = 7):
    """EXACT Hamming-≤max_ham SimHash pairs (md5 family): banded-equality
    candidates + in-bucket exact Hamming.  With 8 bands of 8 bits and
    ``max_ham ≤ 7``, pigeonhole guarantees every qualifying pair shares
    ≥1 band — the emitted set is provably the full Hamming ball, which
    is what makes the SQL mirror an exact oracle."""
    from engine.rayds.shuffle import hash_shuffle_agg

    if max_ham >= SIMHASH_BANDS:
        raise ValueError("max_ham must be < SIMHASH_BANDS for exact recall")

    def bucket_fn(group: pa.Table) -> pa.Table:
        ids = group["doc_id"].to_numpy()
        fp = group["fp"].to_numpy()
        order = np.argsort(ids, kind="stable")
        ids, fp = ids[order], fp[order]
        if len(ids) < 2:
            return pa.table({"a": pa.array([], type=pa.int64()),
                             "b": pa.array([], type=pa.int64()),
                             "hamming": pa.array([], type=pa.int64())})
        if len(ids) > LOUD_BUCKET:
            raise RuntimeError(
                f"SimHash band bucket of {len(ids)} members exceeds the "
                f"loud guard ({LOUD_BUCKET})"
            )
        ai, bi = np.triu_indices(len(ids), k=1)
        x = (fp[ai] ^ fp[bi]).view(np.uint64)
        ham = np.zeros(len(x), dtype=np.int64)
        for s in range(0, 64, 8):
            ham += _POP8[((x >> np.uint64(s)) & np.uint64(0xFF)).astype(np.int64)]
        keep = ham <= max_ham
        return pa.table({"a": pa.array(ids[ai][keep]),
                         "b": pa.array(ids[bi][keep]),
                         "hamming": pa.array(ham[keep])})

    exploded = docs_ds.map_batches(
        simhash_md5_batch, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True,
    )
    cand = partitioned_buckets(exploded, ("band", "val"), bucket_fn)
    # a pair found in several bands appears once per band — dedupe
    # (hamming identical in each)
    return hash_shuffle_agg(cand, ["a", "b"], [("hamming", "min")], ["hamming"])


_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.int64)


def minhash_verified_pairs_md5(docs_ds, threshold: float = 0.5, **kw):
    """md5-LSH candidates verified with exact window Jaccard — the full
    chain (tokenize→shingle→permute→band→bucket→pair→exact-Jaccard) is
    bit-reproducible as a DuckDB oracle.  Same two physical verify plans
    as ``minhash_verified_pairs``."""
    return minhash_verified_pairs(
        docs_ds, threshold,
        explode_fn=minhash_md5_batch,
        bucket_keys=("band", "bucket"),
        pair_fn=_bucket_pairs_loud(),
        shingle_fn=shingle_sets_md5,
        **kw,
    )
