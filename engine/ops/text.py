"""Text analysis stages over the ``documents`` table.

Training-data-pipeline operators (engine-level, beyond the reference's
geometry scope): token counting, quality scoring, language-ID heuristic,
document fingerprinting.  All are ``map_batches`` kernels; the hot parts
use ``pyarrow.compute`` string kernels (vectorized C), not Python row
loops.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


# BPE-ish pre-tokenizer: runs of letters / digits / other-non-space —
# the GPT-2-style coarse split a byte-pair tokenizer starts from.  RE2
# syntax on both sides (pyarrow and DuckDB embed RE2), so the SQL oracle
# counts the identical matches.
BPE_SPLIT_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def token_stats(batch: pa.Table) -> pa.Table:
    """+ n_tokens (single-space split, = count(' ')+1 — the SQL-mirrorable
    definition), + n_bpe_tokens (BPE-ish regex pre-tokens), + n_chars_calc."""
    text = batch["text"]
    spaces = pc.count_substring(text, " ")
    n_tokens = pc.add(spaces, 1)
    n_bpe = pc.count_substring_regex(text, BPE_SPLIT_RE)
    return batch.append_column("n_tokens", pc.cast(n_tokens, pa.int64())) \
                .append_column("n_bpe_tokens", pc.cast(n_bpe, pa.int64())) \
                .append_column("n_chars_calc", pc.cast(pc.utf8_length(text), pa.int64()))


_STOPWORDS = ("the", "and", "of", "to", "a", "in")


def quality_score(batch: pa.Table) -> pa.Table:
    """+ quality features: mean word length, stopword ratio, digit ratio.

    All via vectorized pyarrow string kernels (count_substring /
    count_substring_regex); score = crude linear combination in [0,1]
    (heuristic quality filter of large-scale text pipelines).
    """
    text = batch["text"]
    nchars = pc.cast(pc.utf8_length(text), pa.float64())
    ntok = pc.cast(pc.add(pc.count_substring(text, " "), 1), pa.float64())
    digits = pc.cast(pc.count_substring_regex(text, r"[0-9]"), pa.float64())
    stop = None
    for w in _STOPWORDS:
        c = pc.cast(pc.count_substring(text, f" {w} "), pa.float64())
        stop = c if stop is None else pc.add(stop, c)
    nchars_np = nchars.to_numpy(zero_copy_only=False)
    ntok_np = ntok.to_numpy(zero_copy_only=False)
    with np.errstate(divide="ignore", invalid="ignore"):
        mean_wlen = np.where(ntok_np > 0, nchars_np / ntok_np, 0.0)
        stop_ratio = np.where(
            ntok_np > 0, stop.to_numpy(zero_copy_only=False) / ntok_np, 0.0
        )
        digit_ratio = np.where(
            nchars_np > 0, digits.to_numpy(zero_copy_only=False) / nchars_np, 0.0
        )
    score = np.clip(
        0.5 + 0.8 * stop_ratio - 0.6 * digit_ratio - 0.04 * np.abs(mean_wlen - 5.5),
        0.0,
        1.0,
    )
    return (
        batch.append_column("mean_wlen", pa.array(mean_wlen))
        .append_column("stop_ratio", pa.array(stop_ratio))
        .append_column("digit_ratio", pa.array(digit_ratio))
        .append_column("quality", pa.array(score))
    )


# marker substrings per language (n-gram heuristic language ID)
_LANG_MARKERS = {
    "en": (" the ", " and ", " is "),
    "es": (" el ", " la ", " que "),
    "de": (" der ", " und ", " die "),
    "fr": (" le ", " et ", " les "),
}


def lang_id(batch: pa.Table) -> pa.Table:
    """+ pred_lang: argmax of per-language marker-substring counts
    (vectorized: one count_substring pass per marker), 'und' when all 0."""
    text = batch["text"]
    n = len(batch)
    scores = np.zeros((len(_LANG_MARKERS), n), dtype=np.int64)
    langs = list(_LANG_MARKERS)
    for li, lang in enumerate(langs):
        for m in _LANG_MARKERS[lang]:
            scores[li] += pc.count_substring(text, m).to_numpy(zero_copy_only=False)
    best = np.argmax(scores, axis=0)
    hit = scores.max(axis=0) > 0
    pred = np.where(hit, np.array(langs, dtype=object)[best], "und")
    return batch.append_column("pred_lang", pa.array(pred.tolist(), type=pa.string()))


def fingerprint_md5(batch: pa.Table) -> pa.Table:
    """+ fp_hex: first 16 hex chars of md5(text) — the ORACLE-expressible
    fingerprint (DuckDB: substr(md5(text), 1, 16)); ``fingerprint``'s
    fp64 remains the cheaper shuffle key for exact dedup at scale.
    MD5 is computed vectorized over the Arrow string buffer
    (engine/ops/vhash.py) — no per-row hashlib loop."""
    from engine.ops.vhash import md5_hex

    fps = md5_hex(batch["text"], prefix=16)
    return batch.append_column("fp_hex", pa.array(fps, type=pa.string()))


def fingerprint(batch: pa.Table) -> pa.Table:
    """+ fp64: 64-bit content fingerprint — cheap exact-dup key that
    avoids shuffling the full text at scale.  Vectorized positional
    polynomial hash over the flat Arrow string buffer (the same
    ``reduceat`` machinery as the engine's shuffle-key hash; the old
    per-row crc32 loop was the banned row-loop shape)."""
    from engine.rayds.shuffle import _col_hash

    fps = _col_hash(batch["text"])
    return batch.append_column("fp64", pa.array(fps.view(np.int64)))


# ---------------------------------------------------------------------------
# BM25 keyword scoring — the retrieval/quality-filter primitive of a
# training-data pipeline (score documents against a fixed query, keep
# top-k).  Two streaming passes, nothing unbounded on the driver:
#   pass 1 (tiny): per-block (doc count, token sum, per-term doc-freq)
#     partials fold on the driver into 4-ish scalars — the corpus stats.
#   pass 2: vectorized per-block scoring + per-block top-k combiner, one
#     final merge block (the word_topk shape).
# The score uses the RATIONAL idf  (N - df + 0.5) / (df + 0.5)  — BM25's
# idf without the log wrap — so the DuckDB oracle computes bit-identical
# doubles (libm log() may differ by 1 ulp between engines; every other
# op here is IEEE-exact given identical expression order).  The classic
# log-idf is a monotone transform per term; for fixed-query top-k
# filtering the rational form ranks comparably and is reproducible.

BM25_K1, BM25_B = 1.2, 0.75


def _term_freqs(text_col, terms: list[str]):
    """(doc lengths, [tf per term]) via ONE whitespace split: flatten the
    token ListArray and segment-sum equality masks with reduceat."""
    arr = text_col
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    toks = pc.split_pattern(arr, " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    off = toks.offsets.to_numpy().astype(np.int64)
    values = toks.values
    dl = off[1:] - off[:-1]
    n = len(arr)
    starts = off[:-1] - off[0]
    tfs = []
    nz = dl > 0
    for t in terms:
        tf = np.zeros(n, dtype=np.int64)
        if len(values) and nz.any():
            eq = pc.equal(values, t).to_numpy(zero_copy_only=False).astype(
                np.int64)
            # reduceat over NON-EMPTY segment starts only: empty segments
            # (null/zero-token docs) occupy no values, so consecutive
            # non-empty starts span exactly their own segment — clipping
            # a trailing empty start back into the array would instead
            # truncate the last real doc's segment (dropping its final
            # token) and hand that token to the zeroed empty segment
            tf[nz] = np.add.reduceat(eq, starts[nz])
        tfs.append(tf)
    return dl, tfs


def bm25_corpus_stats(docs_ds, terms: list[str], text_col: str = "text"):
    """(N, total_tokens, [df per term]) — per-block partials, driver fold
    of one tiny row per block."""
    def partial(batch: pa.Table) -> pa.Table:
        dl, tfs = _term_freqs(batch[text_col], terms)
        cols = {
            "_n": pa.array([len(dl)], type=pa.int64()),
            "_tok": pa.array([int(dl.sum())], type=pa.int64()),
        }
        for i, tf in enumerate(tfs):
            cols[f"_df{i}"] = pa.array([int((tf > 0).sum())], type=pa.int64())
        return pa.table(cols)

    parts = docs_ds.map_batches(
        partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )

    def tree_sum(batch: pa.Table) -> pa.Table:
        return pa.table({
            c: pa.array([int(pc.sum(batch[c]).as_py() or 0)], type=pa.int64())
            for c in batch.column_names
        })

    # raw-task tree fold — the driver must not collect one partial row
    # per block at 10^6-block scale (and Repartition's fixed barrier
    # costs seconds at any size)
    from engine.rayds.shuffle import tree_fold_refs

    t = tree_fold_refs(parts,
                       lambda tbls: tree_sum(pa.concat_tables(tbls)))
    n = int(pc.sum(t["_n"]).as_py() or 0)
    tok = int(pc.sum(t["_tok"]).as_py() or 0)
    dfs = [int(pc.sum(t[f"_df{i}"]).as_py() or 0) for i in range(len(terms))]
    return n, tok, dfs


def bm25_topk(docs_ds, terms: list[str], k: int = 20,
              k1: float = BM25_K1, b: float = BM25_B,
              text_col: str = "text", id_col: str = "doc_id"):
    """Top-k documents by (rational-idf) BM25 against ``terms`` —
    (doc_id, score) Dataset, ties broken by ascending doc id."""
    n, tok, dfs = bm25_corpus_stats(docs_ds, terms, text_col)
    if n == 0:
        import ray.data

        return ray.data.from_arrow(pa.table({
            id_col: pa.array([], type=pa.int64()),
            "score": pa.array([], type=pa.float64()),
        }))
    avgdl = tok / n
    idfs = [(n - df + 0.5) / (df + 0.5) for df in dfs]

    def score_block(batch: pa.Table) -> pa.Table:
        dl, tfs = _term_freqs(batch[text_col], terms)
        dlf = dl.astype(np.float64)
        norm = k1 * (1.0 - b + b * (dlf / avgdl))
        s = np.zeros(len(dl), dtype=np.float64)
        for idf, tf in zip(idfs, tfs):
            tff = tf.astype(np.float64)
            s = s + idf * (tff * (k1 + 1.0)) / (tff + norm)
        ids = batch[id_col].to_numpy()
        keep = np.lexsort((ids, -s))[:k]  # block top-k combiner
        return pa.table({id_col: pa.array(ids[keep]),
                         "score": pa.array(s[keep])})

    part = docs_ds.select_columns([id_col, text_col]).map_batches(
        score_block, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )

    def final(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy()
        s = batch["score"].to_numpy()
        keep = np.lexsort((ids, -s))[:k]
        return pa.table({id_col: pa.array(ids[keep]),
                         "score": pa.array(s[keep])})

    # tree top-k fan-in — no merge level receives blocks×k rows raw, and
    # the fold runs as raw task waves (Repartition's fixed barrier costs
    # seconds at any size)
    import ray.data

    from engine.rayds.shuffle import tree_fold_refs

    def combine(tbls: list[pa.Table]) -> pa.Table:
        return final(pa.concat_tables(tbls).combine_chunks())

    return ray.data.from_arrow(tree_fold_refs(part, combine, width=16))


# ---------------------------------------------------------------------------
# PII / sensitive-term redaction — the rewrite stage of a curation
# pipeline.  Pure per-row map, no state, no exchange: the 100-TB shape
# is exactly this (stream blocks through a vectorized RE2 rewrite).
# pyarrow and DuckDB both embed RE2, so the SQL oracle
# (regexp_replace(..., 'g')) rewrites the identical matches.


def redact(batch: pa.Table, pattern: str, replacement: str,
           text_col: str = "text") -> pa.Table:
    """+ ``redacted`` (global regex rewrite) + ``n_redacted`` (match
    count) — both vectorized C kernels over the Arrow string buffer."""
    text = batch[text_col]
    red = pc.replace_substring_regex(text, pattern, replacement)
    n = pc.cast(pc.count_substring_regex(text, pattern), pa.int64())
    return batch.append_column("redacted", red).append_column("n_redacted", n)


# ---------------------------------------------------------------------------
# Weighted source mixing — deterministic Bernoulli downsampling with a
# per-source keep rate (the dataset-mixing op of a training-data
# pipeline: cap overrepresented sources, keep the rest).  The keep
# decision is a pure function of the row id (first md5 byte vs a
# per-source threshold), so the sample is reproducible on any cluster
# size / partitioning and the SQL oracle can mirror it exactly via
# lexicographic hex compare: substr(md5(id),1,2) < 'c0'  ⇔  rate 0.75.


def weighted_mix_mask(id_col, sources, rate_hex: dict[str, str],
                      default_hex: str = "ff") -> np.ndarray:
    """Boolean keep mask.  ``rate_hex`` maps source → 2-hex-char
    threshold ('40'=0.25, '80'=0.5, 'c0'=0.75); unknown sources keep
    with probability int(default_hex,16)/256 ('ff' ≈ keep-all except
    the top 1/256 — pass 2 hex chars; exactness comes from comparing
    the SAME first-byte hex string on both sides)."""
    from engine.ops.vhash import md5_hex

    h2 = md5_hex(id_col, prefix=2)  # numpy array of 2-char strings
    src = np.asarray(sources.to_pylist() if hasattr(sources, "to_pylist")
                     else sources, dtype=object)
    thr = np.full(len(src), default_hex, dtype="U2")
    for s, t in rate_hex.items():
        thr[src == s] = t
    return h2.astype("U2") < thr


# ---------------------------------------------------------------------------
# Within-document repetition stats — the repetition quality filter
# (drop docs whose token stream is mostly duplicates).  Distinct-token
# counting is exact and fully vectorized: one whitespace split, Arrow
# dictionary_encode (C) maps tokens to integer codes, and distinct
# (doc, code) pairs fall out of one int64 np.unique — no Python row
# loop, no hashing collisions.


def dup_stats(batch: pa.Table, text_col: str = "text",
              id_col: str = "doc_id") -> pa.Table:
    """→ (id, n_tokens, n_distinct, dup_ratio) per document, where
    dup_ratio = (n_tokens − n_distinct) / n_tokens as a single fixed
    float expression (the SQL oracle mirrors list_distinct exactly)."""
    if batch.num_rows == 0:
        return pa.table({id_col: batch[id_col],
                         "n_tokens": pa.array([], pa.int64()),
                         "n_distinct": pa.array([], pa.int64()),
                         "dup_ratio": pa.array([], pa.float64())})
    words = pc.split_pattern(batch[text_col], " ")
    n = pc.list_value_length(words).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(words)
    codes = pc.dictionary_encode(flat.combine_chunks()).indices \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    doc = np.repeat(np.arange(len(n), dtype=np.int64), n)
    ncodes = int(codes.max()) + 1 if len(codes) else 1
    pair = doc * ncodes + codes
    uniq_doc = np.unique(pair) // ncodes
    n_distinct = np.bincount(uniq_doc, minlength=len(n)).astype(np.int64)
    ratio = (n - n_distinct) / n.astype(np.float64)
    return pa.table({id_col: batch[id_col],
                     "n_tokens": pa.array(n),
                     "n_distinct": pa.array(n_distinct),
                     "dup_ratio": pa.array(ratio)})


def doc_distinct_words(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-document DISTINCT words of a block (single-space split — the
    SQL-mirrorable ``string_split(text, ' ')`` contract), one output row
    per (doc, word).  Each document is exactly one input row, so
    per-block dedup IS global per-doc dedup: the document-frequency
    pipeline needs no doc_id downstream.

    Vectorized: list-flatten + dictionary-encode the word vocabulary,
    then one ``np.unique`` over a (row, code) composite int64."""
    words = pc.split_pattern(batch[text_col], " ")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    flat = pc.list_flatten(words)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    if len(flat) == 0:
        return pa.table({"word": pa.array([], type=pa.string())})
    n = pc.list_value_length(words).to_numpy(zero_copy_only=False)
    enc = pc.dictionary_encode(flat)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    row = np.repeat(np.arange(len(n), dtype=np.int64), n)
    nv = len(enc.dictionary)
    uniq = np.unique(row * nv + codes)
    return pa.table({"word": enc.dictionary.take(pa.array(uniq % nv))})


def bigram_explode(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Consecutive word pairs (w1, w2) within each document — the
    collocation/bigram-LM counting primitive.  Pure offset arithmetic
    over the flattened split ListArray: a pair starts at every flat
    index except each document's last word (split_pattern never emits
    an empty list, so ``offsets[1:]-1`` indexes exactly those)."""
    words = pc.split_pattern(batch[text_col], " ")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    flat = pc.list_flatten(words)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    total = len(flat)
    if total == 0:
        return pa.table({"w1": pa.array([], type=pa.string()),
                         "w2": pa.array([], type=pa.string())})
    offs = words.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    offs = offs - offs[0]  # sliced arrays carry a nonzero base offset
    mask = np.ones(total, dtype=bool)
    mask[offs[1:] - 1] = False
    first = np.nonzero(mask)[0]
    return pa.table({"w1": flat.take(pa.array(first)),
                     "w2": flat.take(pa.array(first + 1))})


def doc_term_freqs(batch: pa.Table, id_col: str = "doc_id",
                   text_col: str = "text") -> pa.Table:
    """Per-document TERM FREQUENCIES (doc_id, word, tf) of a block —
    each document is one input row, so block-local counting is exact
    globally.  One dictionary-encode + one ``np.unique`` with counts
    over a (row, code) composite int64."""
    words = pc.split_pattern(batch[text_col], " ")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    flat = pc.list_flatten(words)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    if len(flat) == 0:
        return pa.table({id_col: pa.array([], type=pa.int64()),
                         "word": pa.array([], type=pa.string()),
                         "tf": pa.array([], type=pa.int64())})
    n = pc.list_value_length(words).to_numpy(zero_copy_only=False)
    enc = pc.dictionary_encode(flat)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    row = np.repeat(np.arange(len(n), dtype=np.int64), n)
    nv = len(enc.dictionary)
    uniq, cnt = np.unique(row * nv + codes, return_counts=True)
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    return pa.table({
        id_col: pa.array(ids[(uniq // nv)]),
        "word": enc.dictionary.take(pa.array(uniq % nv)),
        "tf": pa.array(cnt.astype(np.int64)),
    })


# --- char-trigram language model (quality scoring, KenLM-style) ----------

TRI_BUCKETS = 1 << 16  # hashing-trick model size: fixed 512 KiB of int64


def _str_buffers(col) -> tuple[np.ndarray, np.ndarray]:
    """Raw (data_bytes, byte_offsets) of an Arrow string column —
    zero-copy views honoring the array offset."""
    arr = col
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    bo = arr.offset
    n = len(arr)
    off = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
        bo:bo + n + 1].astype(np.int64)
    buf = arr.buffers()[2]
    data = (np.frombuffer(buf, dtype=np.uint8)
            if buf is not None else np.empty(0, np.uint8))
    return data, off


def _concat_ranges(counts: np.ndarray) -> np.ndarray:
    """0..c_i−1 concatenated for every i (vectorized arange-per-group)."""
    total = int(counts.sum())
    ix = np.arange(total, dtype=np.int64)
    resets = np.repeat(np.cumsum(counts) - counts, counts)
    return ix - resets


def _tri_hashes(data: np.ndarray,
                off: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Bucketed char-trigram hashes of every doc, flat + per-doc counts.

    Every length-3 byte window inside a doc (never across docs) hashes
    to ``(b0·65599 + b1·257 + b2) mod TRI_BUCKETS`` — one gather per
    byte position, no loops."""
    lens = off[1:] - off[:-1]
    nt = np.maximum(lens - 2, 0)
    if nt.sum() == 0:
        return np.empty(0, dtype=np.int64), nt
    starts = np.repeat(off[:-1], nt) + _concat_ranges(nt)
    h = (data[starts].astype(np.int64) * 65599
         + data[starts + 1].astype(np.int64) * 257
         + data[starts + 2].astype(np.int64)) % TRI_BUCKETS
    return h, nt


def trigram_model_partial(batch: pa.Table, text_col: str = "text",
                          lang_col: str = "lang",
                          ref_lang: str = "en") -> pa.Table:
    """Per-block model partial: bucket counts over the REFERENCE-class
    docs only (TRI_BUCKETS rows of int64 — fixed size, data-independent)."""
    t = batch.filter(pc.equal(batch[lang_col], ref_lang))
    if t.num_rows == 0:
        cnt = np.zeros(TRI_BUCKETS, dtype=np.int64)
    else:
        data, off = _str_buffers(t[text_col])
        h, _ = _tri_hashes(data, off)
        cnt = np.bincount(h, minlength=TRI_BUCKETS).astype(np.int64)
    return pa.table({"cnt": pa.array(cnt)})


def fold_trigram_model(tbls: list[pa.Table]) -> pa.Table:
    out = np.zeros(TRI_BUCKETS, dtype=np.int64)
    for t in tbls:
        if t.num_rows:
            out += t["cnt"].to_numpy()
    return pa.table({"cnt": pa.array(out)})


def lm_score_docs(batch: pa.Table, model: np.ndarray, total: int,
                  text_col: str = "text") -> np.ndarray:
    """Per-doc mean log2 probability under the add-one-smoothed bucket
    model.  The per-doc sum is np.add.reduceat — STRICTLY SEQUENTIAL in
    document order, so scores are identical at any partitioning.  Docs
    with no trigram score 0.0."""
    data, off = _str_buffers(batch[text_col])
    h, nt = _tri_hashes(data, off)
    scores = np.zeros(len(nt), dtype=np.float64)
    if len(h):
        logp = np.log2((model[h] + 1.0) / float(total + TRI_BUCKETS))
        starts = np.cumsum(nt) - nt
        nz = nt > 0
        sums = np.add.reduceat(logp, starts[nz])
        scores[nz] = sums / nt[nz]
    return scores


def ngram_explode(batch: pa.Table, n: int = 5, text_col: str = "text",
                  id_col: str = "doc_id") -> pa.Table:
    """Word n-grams per document — (doc_id, gram) rows, pure offset
    arithmetic over the flattened split ListArray (the k-gram
    generalization of ``bigram_explode``): a gram starts at every flat
    index whose document still has n−1 following words, so the last
    n−1 positions of each doc mask out (clamped to the doc start so a
    short doc never clobbers its predecessor's positions)."""
    words = pc.split_pattern(batch[text_col], " ")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    flat = pc.list_flatten(words)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    total = len(flat)
    if total == 0:
        return pa.table({id_col: pa.array([], type=pa.int64()),
                         "gram": pa.array([], type=pa.string())})
    offs = words.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    offs = offs - offs[0]  # sliced arrays carry a nonzero base offset
    mask = np.ones(total, dtype=bool)
    for k in range(1, n):
        mask[np.maximum(offs[1:] - k, offs[:-1])] = False
    start = np.nonzero(mask)[0]
    if len(start) == 0:
        return pa.table({id_col: pa.array([], type=pa.int64()),
                         "gram": pa.array([], type=pa.string())})
    parts = [flat.take(pa.array(start + k)) for k in range(n)]
    gram = pc.binary_join_element_wise(*parts, " ")
    doc_idx = np.searchsorted(offs[1:], start, side="right")
    ids = batch[id_col].to_numpy(zero_copy_only=False)[doc_idx]
    return pa.table({id_col: pa.array(ids), "gram": gram})
