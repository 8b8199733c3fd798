"""Count-min sketch guarantees: never underestimates, ε·N bound,
linear-merge partition invariance, hash kernel parity."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from engine.ops.sketch import (CM_D, CM_W, _hash_words, cm_estimate,
                               cm_sketch, cm_word_counts)


def test_hash_words_sliced_parity():
    a = pa.array(["alpha", "beta", "gamma", "beta", "x"])
    full = _hash_words(a)
    sliced = _hash_words(a.slice(1, 3))
    assert np.array_equal(sliced, full[1:4])
    # equal words hash equal, distinct words distinct (here)
    assert full[1] == full[3]
    assert len(set(full.tolist())) == 4


def test_cm_never_underestimates_and_bound():
    rng = np.random.default_rng(3)
    # zipf-ish corpus over 3000 distinct words
    words = [f"w{int(z)}" for z in rng.zipf(1.3, size=40_000) % 3000]
    arr = pa.array(words)
    h = _hash_words(arr)
    m = cm_sketch(h)
    uniq, cnt = np.unique(np.asarray(words), return_counts=True)
    hu = _hash_words(pa.array(uniq.tolist()))
    est = cm_estimate(m, hu)
    assert (est >= cnt).all()
    # classic bound: overestimate ≤ e/W · N with prob 1 − e^-D; assert
    # a loose deterministic multiple for this fixed corpus
    assert (est - cnt).max() <= 3 * len(words) // CM_W + 5


def test_cm_linear_merge(ray_session):
    texts = ["a b c d " * 20, "b c d e " * 15, "c d e f " * 10] * 30
    ds1 = ray.data.from_arrow(pa.table({"text": pa.array(texts)}))
    ds2 = ray.data.from_arrow(pa.table({"text": pa.array(texts)})) \
        .repartition(17)
    m1, n1 = cm_word_counts(ds1, "text")
    m2, n2 = cm_word_counts(ds2, "text")
    assert n1 == n2
    assert np.array_equal(m1, m2)  # linearity: partitioning invisible


def test_word_freq_cm_query(ray_session):
    from __ray_entry__ import _q_word_freq_cm

    t = _q_word_freq_cm("/root/testdata/sf0.001")
    exact = t["exact_n"].to_numpy()
    est = t["est_n"].to_numpy()
    ntok = int(t["n_tokens"][0].as_py())
    assert (est >= exact).all()
    assert (est - exact <= 3 * ntok // CM_W + 5).all()
    assert len(t) == 20
