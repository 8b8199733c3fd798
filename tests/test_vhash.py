"""Vectorized MD5 vs hashlib — bit-for-bit, across padding boundaries."""

import hashlib

import numpy as np
import pyarrow as pa

from engine.ops import vhash


def _cases():
    strs = [
        "", "a", "abc", "img123", "hello world",
        "x" * 55, "x" * 56, "x" * 63, "x" * 64, "x" * 65,
        "y" * 119, "y" * 120, "y" * 128, "z" * 1000,
        "ünïcode tëxt ありがとう",  # multi-byte UTF-8
        "the quick brown fox jumps over the lazy dog",
    ]
    strs += [f"img{i}" for i in range(100)]
    strs += [str(i) for i in range(100)]
    return strs


def test_md5_hex_matches_hashlib():
    strs = _cases()
    got = vhash.md5_hex(pa.array(strs))
    want = [hashlib.md5(s.encode()).hexdigest() for s in strs]
    assert list(got) == want


def test_md5_hex_prefix():
    strs = ["abc", "def"]
    got = vhash.md5_hex(pa.array(strs), prefix=16)
    want = [hashlib.md5(s.encode()).hexdigest()[:16] for s in strs]
    assert list(got) == want


def test_md5_first_nibble():
    strs = _cases()
    got = vhash.md5_first_nibble(pa.array(strs))
    want = [int(hashlib.md5(s.encode()).hexdigest()[0], 16) for s in strs]
    assert list(got) == want


def test_md5_numpy_input():
    ids = np.arange(50, dtype=np.int64).astype(str)
    got = vhash.md5_hex(ids)
    want = [hashlib.md5(str(i).encode()).hexdigest() for i in range(50)]
    assert list(got) == want


def test_md5_empty_column():
    assert len(vhash.md5_hex(pa.array([], type=pa.string()))) == 0


def test_md5_chunked_and_sliced():
    arr = pa.chunked_array([pa.array(["abc", "de"]), pa.array(["fgh"])])
    got = vhash.md5_hex(arr)
    want = [hashlib.md5(s.encode()).hexdigest() for s in ["abc", "de", "fgh"]]
    assert list(got) == want
    sl = pa.array(["aa", "bb", "cc"]).slice(1, 2)
    got2 = vhash.md5_hex(sl)
    want2 = [hashlib.md5(s.encode()).hexdigest() for s in ["bb", "cc"]]
    assert list(got2) == want2
