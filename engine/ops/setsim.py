"""Exact SET-SIMILARITY SELF-JOIN (AllPairs/PPJoin prefix filtering).

Finds all id pairs whose token sets have Jaccard ≥ τ — exactly, with
the classic prefix-filtering bound: order every set by GLOBAL token
frequency (rarest first, ties by token id); if J(A,B) ≥ τ then A and B
share at least one token among their first |x| − ⌈τ·|x|⌉ + 1 tokens, so
candidate generation only buckets on PREFIX tokens (the rare ones) and
never explodes on frequent tokens.

Dataflow (every exchange moves narrow int64 rows; no driver
materialization beyond the bounded candidate-pair table):

1. ONE materializing pass over the input (tok, id) rows; per-block
   distinct token-frequency partials fold on the driver and broadcast
   as a sorted lookup (approximate across blocks — the prefix bound is
   exact under ANY consistent global token order; frequency order is
   purely the candidate-count heuristic);
2. one exchange on id: the partition holds every row of its ids, so
   set sizes are run lengths after an in-sort dedupe; per-partition
   lexsort by (id, freq, token) + run-relative ranks mark each id's
   prefix tokens;
3. one exchange on prefix token: vectorized intra-run pair explode
   (o1 < o2, the basket-mining primitive); band-duplicate candidates
   dedupe in one np.unique at the driver collect the broadcast needs
   anyway;
4. verify: the deduped pair table broadcasts once (``ray.put`` — the
   engine's broadcast-pairs plan, size-guarded like the MinHash
   verify); one map over the (id, token) rows routes each member's
   tokens to its pairs' verify partitions; ONE exchange computes exact
   intersections via a lexsort adjacent-duplicate count (a token
   appears once per side, any int64 token) and applies the integer
   threshold  tau_den·inter ≥ tau_num·(c1 + c2 − inter)  — τ as an
   exact rational, no float Jaccard anywhere.

At 100 TB a degenerate hot prefix token would get the same bucket-cap
discipline as the LSH families (cap + targeted re-salt); the sf data
never comes close.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

PAIR_BROADCAST_MAX = 5_000_000  # verify-plan budget (narrow int64 rows)
HOT_TOKEN_CAP = 20_000  # max ids sharing one PREFIX token (loud guard)


def setsim_join(pairs_ds, id_col: str, tok_col: str,
                tau_num: int = 1, tau_den: int = 2,
                num_parts: int = 64):
    """All (o1 < o2) with Jaccard(tokens(o1), tokens(o2)) ≥
    tau_num/tau_den over an (id, token) row MULTISET — duplicates
    dedupe for free inside the exchanges' lexsorts (a separate
    distinct-pairs shuffle upstream would cost a whole extra
    all-to-all).  Returns a Dataset of (o1, o2, inter, c1, c2)."""
    import ray
    import ray.data

    from engine.ops.basket import _intra_run_pairs
    from engine.rayds.shuffle import hash_exchange_groups

    def to_rows(t: pa.Table) -> pa.Table:
        return pa.table({"tok": t[tok_col], "id": t[id_col]})

    # ONE pass over the input: everything downstream (freq partials,
    # the id exchange, the verify routing) consumes these in-memory
    # blocks — every extra Dataset execution costs ~1 s fixed here
    rows = pairs_ds.map_batches(to_rows, batch_format="pyarrow",
                                batch_size=None,
                                zero_copy_batch=True).materialize()

    # GLOBAL token frequencies (DISTINCT per id): per-block combiner
    # partials folded on the driver and BROADCAST as a sorted lookup —
    # the vocabulary is small by construction, and both a frequency
    # equi-join and a grouped_count shuffle would each cost a full
    # extra all-to-all + Dataset execution.
    def fpartial(t: pa.Table) -> pa.Table:
        g = t.group_by(["tok", "id"]).aggregate([]).group_by(
            ["tok"]).aggregate([([], "count_all")])
        return g.rename_columns(["tok", "_f"])

    fp = rows.map_batches(fpartial, batch_format="pyarrow", batch_size=None)
    budget_ok = True
    ftoks, fcnts, total_f = [], [], 0
    for b in fp.iter_batches(batch_format="pyarrow"):
        ftoks.append(b["tok"].to_numpy())
        fcnts.append(b["_f"].to_numpy())
        total_f += len(b)
        if total_f > 4 * PAIR_BROADCAST_MAX:
            budget_ok = False
            break
    fref = None
    exchange_in = rows
    if budget_ok:
        ft = np.concatenate(ftoks) if ftoks else np.empty(0, np.int64)
        fc = np.concatenate(fcnts) if fcnts else np.empty(0, np.int64)
        forder = np.argsort(ft, kind="stable")
        ft, fc = ft[forder], fc[forder]
        new_tok = (np.r_[True, ft[1:] != ft[:-1]] if len(ft)
                   else np.empty(0, bool))
        starts = np.flatnonzero(new_tok)
        ftu = ft[starts]
        fcu = np.add.reduceat(fc, starts) if len(ft) else fc
        if len(ftu) > PAIR_BROADCAST_MAX:
            budget_ok = False
        else:
            fref = ray.put((ftu, fcu))
    if not budget_ok:
        # FALLBACK join plan (vocabulary past the broadcast budget):
        # distinct (tok, id) → per-token count as combiner-first
        # grouped counts, frequency attaches through the adaptive
        # equi-join — distributed and bounded, at the price of the
        # extra all-to-all the broadcast fast path avoids.
        from engine.rayds.shuffle import equi_join, grouped_count

        dtok = grouped_count(rows, ["tok", "id"], out_col="_d",
                             use_shuffle="auto")
        freqds = grouped_count(dtok.select_columns(["tok"]), ["tok"],
                               out_col="_f", use_shuffle="auto")
        joined = equi_join(rows, freqds, "tok", "tok", ["id"], ["_f"])
        exchange_in = joined.map_batches(
            lambda t: t.rename_columns(
                [{"_k": "tok"}.get(c, c) for c in t.column_names]),
            batch_format="pyarrow", batch_size=None,
            zero_copy_batch=True)

    def prefix_fn(group: pa.Table) -> pa.Table:
        # the id-exchange partition holds EVERY row of its ids, so the
        # set size c is just the id-run length — no size rollup or
        # second join anywhere; frequencies come from the broadcast
        # (fast path) or ride in as the joined ``_f`` column (fallback)
        g = group.drop_columns(["_part"])
        n = g.num_rows
        if n == 0:
            return pa.table({"tok": pa.array([], type=pa.int64()),
                             "id": pa.array([], type=pa.int64())})
        ids = g["id"].to_numpy()
        tok = g["tok"].to_numpy()
        if fref is not None:
            from engine.rayds.bcast import cached

            ftok, fcnt = cached(fref)
            f = fcnt[np.searchsorted(ftok, tok)]
        else:
            f = g["_f"].to_numpy()
        order = np.lexsort((tok, f, ids))
        ids_s, tok_s = ids[order], tok[order]
        # multiset input: equal (id, tok) rows are adjacent (equal f) —
        # dedupe before ranks so set sizes are true set cardinalities
        uniq = np.r_[True, (ids_s[1:] != ids_s[:-1]) | (tok_s[1:] != tok_s[:-1])]
        if not uniq.all():
            ids_s, tok_s = ids_s[uniq], tok_s[uniq]
        n = len(ids_s)
        new = np.r_[True, ids_s[1:] != ids_s[:-1]]
        starts = np.flatnonzero(new)
        run_id = np.cumsum(new) - 1
        rank = np.arange(n, dtype=np.int64) - starts[run_id]
        c_s = np.diff(np.append(starts, n))[run_id]
        # prefix length |x| − ⌈τ·|x|⌉ + 1 (exact integer ceil)
        plen = c_s - (tau_num * c_s + tau_den - 1) // tau_den + 1
        keep = rank < plen
        return pa.table({"tok": pa.array(tok_s[keep]),
                         "id": pa.array(ids_s[keep])})

    prefix = hash_exchange_groups(exchange_in, ["id"], prefix_fn,
                                  num_parts)

    def pair_fn(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_part"])
        empty = pa.table({"o1": pa.array([], type=pa.int64()),
                          "o2": pa.array([], type=pa.int64())})
        if g.num_rows < 2:
            return empty
        tok = g["tok"].to_numpy()
        ids = g["id"].to_numpy().astype(np.int64)
        order = np.lexsort((ids, tok))
        tok_s, ids_s = tok[order], ids[order]
        total = len(tok_s)
        new = np.r_[True, tok_s[1:] != tok_s[:-1]]
        starts = np.nonzero(new)[0]
        ends = np.append(starts[1:], total)
        worst = int((ends - starts).max())
        if worst > HOT_TOKEN_CAP:
            # exactness forbids silently dropping pairs — fail loudly
            # with the remedy instead of OOMing the task
            hot = tok_s[starts[np.argmax(ends - starts)]]
            raise ValueError(
                f"setsim_join: prefix token {hot!r} is shared by "
                f"{worst} sets (> HOT_TOKEN_CAP={HOT_TOKEN_CAP}); "
                "raise the threshold, pre-filter stopword tokens, or "
                "raise the cap explicitly")
        first, second = _intra_run_pairs(starts, ends, total)
        if len(first) == 0:
            return empty
        a, b = ids_s[first], ids_s[second]
        return pa.table({"o1": pa.array(np.minimum(a, b)),
                         "o2": pa.array(np.maximum(a, b))})

    cand = hash_exchange_groups(prefix, ["tok"], pair_fn, num_parts)

    # --- broadcast-pairs verify (bounded pair table, size-guarded);
    # band-duplicate candidates dedupe in ONE np.unique at the collect
    # the broadcast needs anyway — no extra exchange
    empty_out = pa.table({"o1": pa.array([], type=pa.int64()),
                          "o2": pa.array([], type=pa.int64()),
                          "inter": pa.array([], type=pa.int64()),
                          "c1": pa.array([], type=pa.int64()),
                          "c2": pa.array([], type=pa.int64())})
    cblocks = [b for b in cand.iter_batches(batch_format="pyarrow")]
    ctbl = (pa.concat_tables(cblocks) if cblocks
            else empty_out.select(["o1", "o2"]))
    if ctbl.num_rows == 0:
        return empty_out
    if ctbl.num_rows > PAIR_BROADCAST_MAX:
        raise ValueError(
            f"setsim_join: {ctbl.num_rows} candidate pairs exceed the "
            f"broadcast verify budget {PAIR_BROADCAST_MAX}; raise the "
            "threshold or add a cogroup verify plan")
    raw1 = ctbl["o1"].to_numpy()
    raw2 = ctbl["o2"].to_numpy()
    upair = np.unique(raw1.astype(np.uint64) * np.uint64(1 << 32)
                      + raw2.astype(np.uint64)) \
        if (raw2 < (1 << 32)).all() and (raw1 < (1 << 32)).all() else None
    if upair is not None:
        o1 = (upair >> np.uint64(32)).astype(np.int64)
        o2 = (upair & np.uint64(0xFFFFFFFF)).astype(np.int64)
    else:  # ids past 2^32: structured dedupe
        both = np.stack([raw1, raw2], axis=1)
        both = np.unique(both, axis=0)
        o1, o2 = both[:, 0], both[:, 1]
    members = np.concatenate([o1, o2])
    pidx = np.tile(np.arange(len(o1), dtype=np.int64), 2)
    side = np.repeat(np.array([0, 1], dtype=np.int64), len(o1))
    morder = np.argsort(members, kind="stable")
    bcast = ray.put({
        "members": members[morder], "pidx": pidx[morder],
        "side": side[morder], "o1": o1, "o2": o2})

    def route(batch: pa.Table) -> pa.Table:
        bb = ray.get(bcast)
        mem, pix, sd = bb["members"], bb["pidx"], bb["side"]
        ids = batch["id"].to_numpy()
        tok = batch["tok"].to_numpy()
        lo_ = np.searchsorted(mem, ids, side="left")
        hi_ = np.searchsorted(mem, ids, side="right")
        cnt = hi_ - lo_
        has = cnt > 0
        lo_, cnt = lo_[has], cnt[has]
        tok_h = tok[has]
        flat = (np.repeat(lo_, cnt)
                + (np.arange(int(cnt.sum()), dtype=np.int64)
                   - np.repeat(np.cumsum(cnt) - cnt, cnt)))
        p = pix[flat]
        return pa.table({
            "pp": pa.array(p % num_parts),
            "p": pa.array(p),
            "s": pa.array(sd[flat]),
            "tok": pa.array(np.repeat(tok_h, cnt))})

    routed = rows.map_batches(route, batch_format="pyarrow",
                                  batch_size=None, zero_copy_batch=True)

    def verify(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_part"])
        if g.num_rows == 0:
            return empty_out
        bb = ray.get(bcast)
        p = g["p"].to_numpy()
        s = g["s"].to_numpy()
        tok = g["tok"].to_numpy()
        # multiset input: dedupe (pair, side, token) so each side's
        # token set stays a SET (the adjacent-duplicate intersection
        # count and the c1/c2 cardinalities both rely on it)
        do = np.lexsort((tok, s, p))
        pd_, sd_, td_ = p[do], s[do], tok[do]
        uniq = np.r_[True, (pd_[1:] != pd_[:-1]) | (sd_[1:] != sd_[:-1])
                     | (td_[1:] != td_[:-1])]
        if not uniq.all():
            pd_, sd_, td_ = pd_[uniq], sd_[uniq], td_[uniq]
        order = np.lexsort((td_, pd_))
        p, s, tok = pd_[order], sd_[order], td_[order]
        upairs, pp = np.unique(p, return_inverse=True)
        nup = len(upairs)
        # a token appears ≤1× per side → an adjacent duplicate of
        # (pair, token) is exactly one shared token (any int64 token)
        dup = (p[1:] == p[:-1]) & (tok[1:] == tok[:-1])
        inter = np.zeros(nup, dtype=np.int64)
        np.add.at(inter, pp[1:][dup], 1)
        c1 = np.zeros(nup, dtype=np.int64)
        c2 = np.zeros(nup, dtype=np.int64)
        np.add.at(c1, pp, (s == 0).astype(np.int64))
        np.add.at(c2, pp, (s == 1).astype(np.int64))
        keep = (tau_den * inter >= tau_num * (c1 + c2 - inter)) \
            & (c1 > 0) & (c2 > 0)
        return pa.table({
            "o1": pa.array(bb["o1"][upairs[keep]]),
            "o2": pa.array(bb["o2"][upairs[keep]]),
            "inter": pa.array(inter[keep]),
            "c1": pa.array(c1[keep]),
            "c2": pa.array(c2[keep])})

    return hash_exchange_groups(routed, ["pp"], verify, num_parts)
