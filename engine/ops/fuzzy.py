"""Fuzzy string matching — edit-distance-1 near-duplicate pairs with
EXACT recall (the entity-resolution / fuzzy-dedup operator).

Reference parity: extends the engine past the reference's surface
(shapely has no string ops); semantics pinned by the DuckDB
``levenshtein`` oracle in ``__ray_entry__.oracle_sql``.

Plan (symmetric-delete blocking — the SymSpell construction):

- **explode**: each string emits int64 hash keys for ITSELF and every
  single-character DELETION variant.  If ``ed(a, b) <= 1`` the two key
  sets always intersect (equal → same identity key; one substitution at
  position i → both delete i; one indel → the longer side's deletion of
  the inserted char equals the shorter string's identity key), so
  candidate recall is EXACT.  Hash collisions only ADD candidates —
  every candidate is verified exactly.
- **one hash exchange** on the key (``partitioned_buckets``: 64 coarse
  partitions, per-partition lexsort + run slicing — no fine-key sort).
- **verify**: per bucket, chunked all-pairs check with the O(1)
  longest-common-prefix/suffix rule (vectorized over padded byte
  matrices; exact for ed <= 1):
    * equal length: ed <= 1  ⇔  lcp + lcs >= L - 1,
    * length diff 1: ed = 1  ⇔  lcp + lcs >= min(la, lb).
- **pair dedupe**: pairs sharing several keys collapse through the
  engine's own hash shuffle (min editdist per pair).

Scale: exploded volume = (L+1) keys per string of length L — bound the
keyed prefix (``fuzzy_pairs(..., prefix)``) to keep it linear.  Bucket
sizes are duplicate-clique sizes; the verify is chunked so a hot bucket
streams in bounded memory (the pair OUTPUT of an n-duplicate clique is
inherently O(n²) — that is the operator's semantics, same as the SQL).
Byte-level semantics: exact for ASCII (== DuckDB ``levenshtein`` there);
multi-byte UTF-8 would count bytes, not codepoints — documented scope.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

PAIR_CHUNK = 1 << 18  # verify-matrix chunk: 256k pairs × width ≤ ~32 MB


def _str_matrix(col) -> tuple[np.ndarray, np.ndarray]:
    """Arrow string array/chunked-array → (n, Lmax) zero-padded uint8
    matrix + int64 lengths, straight from the value buffers (no
    per-row Python)."""
    arr = col
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return np.zeros((0, 0), np.uint8), np.zeros(0, np.int64)
    off = np.frombuffer(arr.buffers()[1], np.int32)[
        arr.offset: arr.offset + n + 1].astype(np.int64)
    buf = np.frombuffer(arr.buffers()[2], np.uint8)
    lens = np.diff(off)
    lmax = int(lens.max()) if n else 0
    mat = np.zeros((n, max(lmax, 1)), np.uint8)
    rows = np.repeat(np.arange(n, dtype=np.int64), lens)
    cols = np.arange(len(rows), dtype=np.int64) - np.repeat(
        np.cumsum(lens) - lens, lens)
    mat[rows, cols] = buf[off[0]: off[-1]]
    return mat, lens


KEY_BYTES = 64  # fixed hash window: width-independent keys; longer
# strings truncate (collisions only ADD verified candidates)


def _row_hash(mat: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """int64 hash per row of a zero-padded byte matrix over a FIXED
    ``KEY_BYTES`` window (so equal strings hash equal no matter which
    batch/width they came from); the length is folded in so
    distinct-length strings never share a key via padding."""
    n, width = mat.shape
    w8 = KEY_BYTES // 8
    padded = np.zeros((n, KEY_BYTES), np.uint8)
    padded[:, : min(width, KEY_BYTES)] = mat[:, :KEY_BYTES]
    words = padded.view(np.uint64).reshape(n, w8)
    h = np.full(n, 0xCBF29CE484222325, np.uint64)
    for j in range(w8):
        h ^= words[:, j]
        h *= np.uint64(0x100000001B3)
    h ^= lens.astype(np.uint64)
    h *= np.uint64(0x100000001B3)
    h ^= h >> np.uint64(33)
    return h.view(np.int64)


def _explode_keys(id_col: str, str_col: str):
    """map_batches fn: (id, s) → (bucket, doc_id, title) — identity key
    plus one key per deletion position (columns loop ≤ Lmax, rows stay
    vectorized)."""

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        titles = batch[str_col]
        if isinstance(titles, pa.ChunkedArray):
            titles = titles.combine_chunks()
        mat, lens = _str_matrix(titles)
        n, lmax = mat.shape
        key_parts = [_row_hash(mat, lens)]
        idx_parts = [np.arange(n, dtype=np.int64)]
        for i in range(lmax):
            mask = lens > i
            if not mask.any():
                break
            var = np.concatenate([mat[mask, :i], mat[mask, i + 1:]],
                                 axis=1)
            key_parts.append(_row_hash(var, lens[mask] - 1))
            idx_parts.append(np.nonzero(mask)[0].astype(np.int64))
        keys = np.concatenate(key_parts)
        take = pa.array(np.concatenate(idx_parts))
        return pa.table({
            "bucket": pa.array(keys),
            "doc_id": pa.array(ids[take.to_numpy()]),
            "title": titles.take(take),
        })

    return fn


def _ed1(amat: np.ndarray, la: np.ndarray,
         bmat: np.ndarray, lb: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized exact ed<=1 check over padded byte-matrix pairs →
    (ok mask, editdist 0/1).  See module doc for the lcp/lcs rule."""
    n, width = amat.shape
    minl = np.minimum(la, lb)
    neq = amat != bmat
    lcp = np.minimum(
        np.where(neq.any(axis=1), neq.argmax(axis=1), width), minl)
    idxs = np.arange(width, dtype=np.int64)
    rows = np.arange(n, dtype=np.int64)[:, None]
    cols_a = la[:, None] - 1 - idxs[None, :]
    cols_b = lb[:, None] - 1 - idxs[None, :]
    rev_a = np.where(cols_a >= 0, amat[rows, np.maximum(cols_a, 0)], 0)
    rev_b = np.where(cols_b >= 0, bmat[rows, np.maximum(cols_b, 0)], 0)
    neqr = rev_a != rev_b
    lcs = np.minimum(
        np.where(neqr.any(axis=1), neqr.argmax(axis=1), width), minl)
    diff = np.abs(la - lb)
    equal = (diff == 0) & (lcp == la)
    sub1 = (diff == 0) & ~equal & (lcp + lcs >= la - 1)
    indel = (diff == 1) & (lcp + lcs >= minl)
    ok = equal | sub1 | indel
    return ok, np.where(equal, 0, 1).astype(np.int64)


def _triu_chunks(m: int):
    """Yield (ai, bi) index chunks covering all i < j pairs of range(m)
    with at most ~PAIR_CHUNK pairs materialized at a time (never the
    full O(m²) index arrays — hot duplicate cliques stream)."""
    rows_per = max(1, PAIR_CHUNK // max(m - 1, 1))
    for s in range(0, m, rows_per):
        e = min(s + rows_per, m)
        counts = m - 1 - np.arange(s, e, dtype=np.int64)
        ai = np.repeat(np.arange(s, e, dtype=np.int64), counts)
        bi = (np.arange(len(ai), dtype=np.int64)
              - np.repeat(np.cumsum(counts) - counts, counts)
              + ai + 1)
        if len(ai):
            yield ai, bi


def _bucket_verify(group: pa.Table) -> pa.Table:
    """One candidate bucket: distinct member ids, chunked all-pairs ed<=1
    verify → (a, b, editdist) with a < b."""
    empty = pa.table({"a": pa.array([], type=pa.int64()),
                      "b": pa.array([], type=pa.int64()),
                      "editdist": pa.array([], type=pa.int64())})
    ids = group["doc_id"].to_numpy(zero_copy_only=False)
    uniq, first = np.unique(ids, return_index=True)
    m = len(uniq)
    if m < 2:
        return empty
    mat, lens = _str_matrix(group["title"].take(pa.array(first)))
    outs_a, outs_b, outs_d = [], [], []
    for ca, cb in _triu_chunks(m):
        ok, dist = _ed1(mat[ca], lens[ca], mat[cb], lens[cb])
        if ok.any():
            outs_a.append(uniq[ca[ok]])
            outs_b.append(uniq[cb[ok]])
            outs_d.append(dist[ok])
    if not outs_a:
        return empty
    return pa.table({"a": pa.array(np.concatenate(outs_a)),
                     "b": pa.array(np.concatenate(outs_b)),
                     "editdist": pa.array(np.concatenate(outs_d))})


def fuzzy_pairs(ds, id_col: str, str_col: str, num_parts: int = 64):
    """(id, string) Dataset → (a, b, editdist) pairs with
    levenshtein <= 1, a < b — exact (both recall and precision)."""
    from engine.ops.dedup import partitioned_buckets
    from engine.rayds.shuffle import hash_shuffle_agg

    exploded = ds.map_batches(
        _explode_keys(id_col, str_col), batch_format="pyarrow",
        batch_size=None, zero_copy_batch=True)
    pairs = partitioned_buckets(exploded, ("bucket",), _bucket_verify,
                                num_parts)
    return hash_shuffle_agg(pairs, ["a", "b"], [("editdist", "min")],
                            ["editdist"])
