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
