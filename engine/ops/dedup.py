"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale shapes (SURVEY.md §2.8 / task brief):
- exact: combiner-first groupby on the text (or fp64 fingerprint at
  scale) keeping the lowest doc_id — hash-partition + per-group first.
- MinHash+LSH: shingle → 64 permutations → band buckets → candidate
  pairs via a bucket groupby (the all-to-all moves only (doc, band-hash)
  keys, never documents) → exact-Jaccard verification per pair.
- SimHash: 64-bit sign-hash of token hashes; banded into 4×16-bit keys
  so near pairs (Hamming ≤ k) collide in ≥1 band.
- embedding cosine: per-batch normalized matmul against a broadcast
  matrix (brute force — the testdata fits; the LSH path is the
  scale story and shares the band-bucket machinery).
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

NUM_PERM = 64
BANDS = 16  # 16 bands × 4 rows ≈ threshold ~0.5 Jaccard
_MERSENNE = (1 << 61) - 1
_rng = np.random.default_rng(1234)
_PERM_A = _rng.integers(1, _MERSENNE, size=NUM_PERM, dtype=np.int64)
_PERM_B = _rng.integers(0, _MERSENNE, size=NUM_PERM, dtype=np.int64)


def _shingles(text: str, k: int = 3) -> np.ndarray:
    """crc32 hashes of word k-grams (deterministic, order-free set)."""
    words = text.split()
    if len(words) < k:
        grams = [" ".join(words)] if words else []
    else:
        grams = [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
    return np.array(
        sorted({zlib.crc32(g.encode()) for g in grams}), dtype=np.int64
    )


def minhash_batch(batch: pa.Table) -> pa.Table:
    """documents → one row per (doc_id, band, band_hash): the LSH explode.

    Per doc: sig[p] = min((a_p * shingle + b_p) mod M); bands of
    NUM_PERM/BANDS rows hashed to a bucket key.  The permutation min is
    one vectorized (NUM_PERM × n_shingles) pass per doc.
    """
    ids = batch["doc_id"].to_numpy()
    texts = batch["text"].to_pylist()
    rows_doc, rows_band, rows_hash = [], [], []
    per_band = NUM_PERM // BANDS
    for did, text in zip(ids, texts):
        sh = _shingles(text)
        if len(sh) == 0:
            continue
        # (NUM_PERM, n) modular affine; int64 with explicit mod to avoid overflow
        v = (_PERM_A[:, None] * (sh[None, :] % _MERSENNE)) % _MERSENNE
        sig = ((v + _PERM_B[:, None]) % _MERSENNE).min(axis=1)
        bands = sig.reshape(BANDS, per_band)
        bh = np.array(
            [zlib.crc32(bands[b].tobytes()) for b in range(BANDS)], dtype=np.int64
        )
        rows_doc.extend([did] * BANDS)
        rows_band.extend(range(BANDS))
        rows_hash.extend(bh.tolist())
    return pa.table(
        {
            "doc_id": pa.array(rows_doc, type=pa.int64()),
            "band": pa.array(rows_band, type=pa.int64()),
            "band_hash": pa.array(rows_hash, type=pa.int64()),
        }
    )


def _bucket_pairs(group: pa.Table) -> pa.Table:
    """Within one (band, band_hash) bucket: all doc pairs (a < b)."""
    ids = np.sort(group["doc_id"].to_numpy())
    if len(ids) < 2:
        return pa.table({"a": pa.array([], type=pa.int64()), "b": pa.array([], type=pa.int64())})
    ai, bi = np.triu_indices(len(ids), k=1)
    return pa.table({"a": pa.array(ids[ai]), "b": pa.array(ids[bi])})


def minhash_candidate_pairs(docs_ds):
    """Dataset pipeline: explode → bucket groupby → pair generation →
    global pair dedupe (pairs that collide in several bands appear once).
    """
    exploded = docs_ds.map_batches(
        minhash_batch, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
    pairs = exploded.groupby(["band", "band_hash"]).map_groups(
        _bucket_pairs, batch_format="pyarrow"
    )
    # dedupe (a, b): groupby + count, keep keys
    from engine.rayds.shuffle import grouped_count

    return grouped_count(pairs, ["a", "b"], out_col="n_bands")


def jaccard_verify(pairs_tbl: pa.Table, texts_by_id: dict[int, str],
                   threshold: float = 0.5) -> pa.Table:
    """Exact word-3-gram Jaccard for candidate pairs (verification pass).

    ``texts_by_id`` is the broadcast doc lookup (ray.put once, read in
    every verify task — never re-shipped per batch)."""
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
    """+ simhash:int64 — 64-bit sign-aggregated token-hash fingerprint."""
    texts = batch["text"].to_pylist()
    out = np.empty(len(texts), dtype=np.uint64)
    bitcols = (np.uint64(1) << np.arange(64, dtype=np.uint64))
    for i, t in enumerate(texts):
        toks = t.split()
        if not toks:
            out[i] = 0
            continue
        hs = np.array(
            [zlib.crc32(w.encode()) | (zlib.crc32(w[::-1].encode()) << 32) for w in toks],
            dtype=np.uint64,
        )
        bits = (hs[:, None] & bitcols[None, :]) != 0
        votes = bits.sum(axis=0) * 2 - len(toks)
        out[i] = np.sum(bitcols[votes > 0], dtype=np.uint64)
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
    """(doc_id, simhash) → 4 rows (band_idx, band_val, doc_id, simhash)."""
    sh = batch["simhash"].to_numpy().view(np.uint64)
    ids = batch["doc_id"].to_numpy()
    n = len(ids)
    band_idx = np.repeat(np.arange(4, dtype=np.int64), n)
    band_val = np.concatenate(
        [((sh >> np.uint64(16 * b)) & np.uint64(0xFFFF)).view(np.int64) for b in range(4)]
    )
    return pa.table(
        {
            "band_idx": pa.array(band_idx),
            "band_val": pa.array(band_val),
            "doc_id": pa.array(np.tile(ids, 4)),
            "simhash": pa.array(np.tile(sh.view(np.int64), 4)),
        }
    )


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
        ai, bi = np.triu_indices(len(ids), k=1)
        x = sh[ai] ^ sh[bi]
        # vectorized popcount via byte-LUT
        lut = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(axis=1)
        ham = lut[x.view(np.uint8).reshape(len(x), 8)].sum(axis=1).astype(np.int64)
        keep = ham <= max_ham
        return pa.table(
            {"a": pa.array(ids[ai][keep]), "b": pa.array(ids[bi][keep]),
             "hamming": pa.array(ham[keep])}
        )

    return fn


def simhash_near_pairs(docs_ds, max_ham: int = 8):
    """SimHash near-dup pipeline: hash → 16-bit band explode → bucket
    groupby → in-bucket Hamming verify → global pair dedupe (Min over the
    per-band duplicates keeps one hamming value per pair)."""
    hashed = docs_ds.map_batches(simhash_batch, batch_format="pyarrow", batch_size=None,
                                 zero_copy_batch=True)
    exploded = hashed.select_columns(["doc_id", "simhash"]).map_batches(
        _simhash_explode, batch_format="pyarrow", batch_size=None
    )
    pairs = exploded.groupby(["band_idx", "band_val"]).map_groups(
        _simhash_bucket_pairs(max_ham), batch_format="pyarrow"
    )
    agg = pairs.groupby(["a", "b"]).min("hamming")

    def rename(batch: pa.Table) -> pa.Table:
        return batch.select(["a", "b", "min(hamming)"]).rename_columns(
            ["a", "b", "hamming"]
        )

    return agg.map_batches(rename, batch_format="pyarrow", batch_size=None)


# ------------------------------------------------------- embedding near-dup
class EmbeddingDedup:
    """Actor stage: per-batch cosine vs the broadcast full matrix; emits
    (a, b) pairs with round(cos, 6) ≥ threshold and a < b."""

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
        emb = np.asarray(
            [np.asarray(e, dtype=np.float64) for e in batch["embedding"].to_pylist()]
        )
        norms = np.linalg.norm(emb, axis=1)
        norms[norms == 0] = 1.0
        sims = (emb / norms[:, None]) @ self.unit.T
        ai, bi = np.nonzero(np.round(sims, 6) >= self.threshold)
        a_ids, b_ids = ids[ai], self.ids[bi]
        keep = a_ids < b_ids
        return pa.table({"a": pa.array(a_ids[keep]), "b": pa.array(b_ids[keep])})
