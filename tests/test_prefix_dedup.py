"""Brute-force parity for prefix_shadowed_ids (sorted-adjacency prefix
dedup) — stresses the block-boundary stitch: equal-text runs spanning
several blocks, prefix chains, and blocks made entirely of one text."""

import numpy as np
import pyarrow as pa
import pytest

import ray
import ray.data

from engine.ops.dedup import prefix_shadowed_ids


def brute(texts):
    out = set()
    for i, t in enumerate(texts):
        for j, o in enumerate(texts):
            if i == j:
                continue
            if o.startswith(t) and (len(o) > len(t) or j < i):
                out.add(i)
                break
    return out


def run(texts, blocks):
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(len(texts)), type=pa.int64()),
        "text": pa.array(texts),
    })).repartition(blocks)
    got = prefix_shadowed_ids(ds, "text", "doc_id").to_pandas()
    return set(got["doc_id"].tolist())


def test_prefix_chains_and_dups():
    texts = ["a", "ab", "abc", "abc", "abcd", "b", "ba", "c", "c", "c",
             "ca", "zz"]
    assert run(texts, 5) == brute(texts)


def test_run_spanning_blocks():
    # one text repeated enough to fill multiple 1-row-ish blocks, then a
    # longer extension: ALL copies are shadowed (first by strict prefix
    # of the extension, rest by the lower-id duplicate)
    texts = ["x"] * 9 + ["xy"] + ["w"] * 3
    got = run(texts, 8)
    assert got == brute(texts)
    assert set(range(9)) <= got            # every "x"
    assert 9 not in got                    # "xy" is the kept extension
    assert 10 not in got and {11, 12} <= got  # dup "w"s keep lowest id


def test_no_shadows():
    texts = ["apple", "banana", "cherry", "date"]
    assert run(texts, 3) == set()


def test_random_stress():
    rng = np.random.default_rng(7)
    alphabet = list("abc")
    texts = ["".join(rng.choice(alphabet, size=rng.integers(1, 6)))
             for _ in range(300)]
    for blocks in (1, 7, 32):
        assert run(texts, blocks) == brute(texts), blocks


def test_single_and_empty_strings():
    texts = ["", "", "a", ""]  # empty string is a prefix of everything
    assert run(texts, 2) == brute(texts)
