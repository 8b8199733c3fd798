"""Benchmark-contamination screen: flag corpus documents sharing any
word-n-gram with a (small) benchmark set — the decontamination pass a
training-data pipeline runs before every corpus release.

EXACT string matching, fully vectorized, zero hash collisions: word
n-grams of single-space-tokenized text are contiguous SUBSTRINGS of the
document, so the kernel slices them straight out of the Arrow string
data buffer into a fixed-width ``S{width}`` numpy matrix (NUL-padded —
NUL can't occur in text, so bytes-equality ⇔ n-gram equality) and
membership is one ``searchsorted`` against the sorted benchmark array.

Scale shape (100 TB): the benchmark side is SMALL by nature (real
eval suites are thousands of documents); its distinct n-gram array is
built distributed (per-block unique) with a hard ``budget`` guard,
folded once on the driver, sorted, and broadcast via ``ray.put``.  The
corpus side is one streaming ``map_batches`` pass — no shuffle, no
driver traffic beyond the flagged rows.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

NGRAM_N = 5
MAX_NGRAM_BYTES = 128  # fixed S-dtype width; raise for long-word corpora
BENCH_NGRAM_BUDGET = 5_000_000  # driver-side benchmark-set guard


def _doc_ngram_bytes(texts, n: int = NGRAM_N,
                     width: int = MAX_NGRAM_BYTES):
    """(ngrams S{width}, doc_index int64) for every word-n-gram of every
    doc — vectorized over the Arrow string buffers, no per-doc loop.

    Tokenization contract: words are separated by ONE space (the SQL
    mirror is ``string_split(text, ' ')``); an n-gram is the substring
    from word i's first byte to word i+n-1's last byte.
    """
    arr = texts
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    arr = arr.cast(pa.large_binary())
    if arr.null_count:
        arr = arr.fill_null(b"")
    nd = len(arr)
    if nd == 0:
        return np.empty(0, dtype=f"S{width}"), np.empty(0, dtype=np.int64)
    off = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
        arr.offset:arr.offset + nd + 1]
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    # word boundaries: a word starts at a doc start or after a space
    spaces = np.nonzero(data == 32)[0]
    # clip spaces outside [off[0], off[-1]) (shared buffers)
    spaces = spaces[(spaces >= off[0]) & (spaces < off[-1])]
    doc_of_space = np.searchsorted(off, spaces, side="right") - 1
    # per-doc word starts = doc_start ∪ (space+1); ends = space ∪ doc_end
    starts = np.concatenate([off[:-1], spaces + 1])
    ends = np.concatenate([off[1:], spaces])
    sdoc = np.concatenate([np.arange(nd, dtype=np.int64), doc_of_space])
    order = np.lexsort((starts, sdoc))
    starts, sdoc = starts[order], sdoc[order]
    eorder = np.lexsort((ends, np.concatenate(
        [np.arange(nd, dtype=np.int64), doc_of_space])))
    ends = ends[eorder]
    # words per doc
    wc = np.bincount(sdoc, minlength=nd)
    woff = np.zeros(nd + 1, dtype=np.int64)
    np.cumsum(wc, out=woff[1:])
    # n-gram i of doc d: bytes [starts[woff[d]+i], ends[woff[d]+i+n-1])
    ng_per_doc = np.maximum(wc - (n - 1), 0)
    total = int(ng_per_doc.sum())
    if total == 0:
        return np.empty(0, dtype=f"S{width}"), np.empty(0, dtype=np.int64)
    doc_idx = np.repeat(np.arange(nd, dtype=np.int64), ng_per_doc)
    base = np.repeat(woff[:-1], ng_per_doc)
    within = np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(ng_per_doc) - ng_per_doc, ng_per_doc)
    g_start = starts[base + within]
    g_end = ends[base + within + (n - 1)]
    g_len = g_end - g_start
    if int(g_len.max()) > width:
        raise ValueError(
            f"n-gram of {int(g_len.max())} bytes exceeds width {width}; "
            f"raise MAX_NGRAM_BYTES")
    idx = g_start[:, None] + np.arange(width, dtype=np.int64)[None, :]
    mask = np.arange(width, dtype=np.int64)[None, :] < g_len[:, None]
    mat = np.where(mask, data[np.minimum(idx, len(data) - 1)], 0).astype(
        np.uint8)
    grams = np.ascontiguousarray(mat).view(f"S{width}").ravel()
    return grams, doc_idx


def benchmark_ngram_set(bench_ds, text_col: str = "text", n: int = NGRAM_N,
                        budget: int = BENCH_NGRAM_BUDGET) -> np.ndarray:
    """Sorted distinct n-gram array of the benchmark corpus.  Distinct
    is taken per block BEFORE the driver fold; the fold enforces
    ``budget`` (benchmark suites are small by nature — past the budget
    the caller should partition the screen instead)."""

    def block_unique(batch: pa.Table) -> pa.Table:
        grams, _ = _doc_ngram_bytes(batch[text_col], n)
        u = np.unique(grams)
        return pa.table({"g": pa.array(u.tolist(), type=pa.binary())})

    parts = bench_ds.select_columns([text_col]).map_batches(
        block_unique, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True)
    chunks = []
    seen = 0
    for b in parts.iter_batches(batch_format="pyarrow"):
        a = np.array(
            [x.as_py() for x in b["g"]], dtype=f"S{MAX_NGRAM_BYTES}")
        seen += len(a)
        if seen > budget:
            raise ValueError(
                f"benchmark n-gram set exceeds budget {budget}")
        chunks.append(a)
    if not chunks:
        return np.empty(0, dtype=f"S{MAX_NGRAM_BYTES}")
    return np.unique(np.concatenate(chunks))


def contamination_screen(corpus_ds, bench_sorted_ref, id_col: str = "doc_id",
                         text_col: str = "text", n: int = NGRAM_N):
    """doc_id → n_hits (count of DISTINCT benchmark n-grams present),
    rows only for contaminated docs.  One streaming pass; the sorted
    benchmark array is ``ray.put`` once and probed per batch with
    ``searchsorted`` (exact bytes equality)."""
    from engine.rayds.bcast import cached

    def screen(batch: pa.Table) -> pa.Table:
        bench = cached(bench_sorted_ref)
        empty = pa.table({
            "doc_id": pa.array([], type=pa.int64()),
            "n_hits": pa.array([], type=pa.int64()),
        })
        if batch.num_rows == 0 or len(bench) == 0:
            return empty
        grams, doc_idx = _doc_ngram_bytes(batch[text_col], n)
        if len(grams) == 0:
            return empty
        pos = np.searchsorted(bench, grams)
        pos_c = np.minimum(pos, len(bench) - 1)
        hit = bench[pos_c] == grams
        if not hit.any():
            return empty
        hd, hp = doc_idx[hit], pos[hit]
        # distinct (doc, benchmark n-gram) pairs
        pair = hd * np.int64(len(bench)) + hp
        upair = np.unique(pair)
        udoc = upair // np.int64(len(bench))
        docs, counts = np.unique(udoc, return_counts=True)
        ids = batch[id_col].to_numpy(zero_copy_only=False)[docs]
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "n_hits": pa.array(counts.astype(np.int64), type=pa.int64()),
        })

    return corpus_ds.select_columns([id_col, text_col]).map_batches(
        screen, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True)
