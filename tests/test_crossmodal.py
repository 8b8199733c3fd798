"""Cross-modal dedup clusters: CC labels must equal a driver
union-find over the union of the text-pair and embedding-pair sets —
and the union must actually MERGE clusters neither modality finds
alone."""

import numpy as np
import pyarrow as pa

import ray
import ray.data


def _to_table(res):
    if isinstance(res, ray.data.Dataset):
        return pa.concat_tables(
            [b for b in res.iter_batches(batch_format="pyarrow")])
    return res


def _pairs(ds):
    t = _to_table(ds)
    return list(zip(t["a"].to_pylist(), t["b"].to_pylist()))


def test_crossmodal_equals_unionfind(ray_session):
    import __ray_entry__ as e
    from engine.ops import dedup

    sf = "/root/testdata/sf0.001"
    tp = _pairs(dedup.minhash_verified_pairs(
        e._docs(sf).select_columns(["doc_id", "text"]), threshold=0.4))
    ep = _pairs(dedup.embed_dedup_pairs(e._embeddings(sf),
                                        threshold=0.4, num_blocks=8))
    all_pairs = tp + ep

    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in all_pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {x: find(x) for x in parent}

    got = _to_table(e._q_crossmodal_dup_clusters(sf)).to_pandas()
    gmap = dict(zip(got.iloc[:, 0], got.iloc[:, 1]))
    # same node set, same min-representative labels
    assert set(gmap) == set(want)
    for k in want:
        assert gmap[k] == want[k], k

    # the union genuinely merges: some cluster holds a text edge AND an
    # embedding edge (the cross-modal story, not two disjoint graphs)
    tset = {find(a) for a, _ in tp if a in parent}
    eset = {find(a) for a, _ in ep if a in parent}
    assert tset & eset
