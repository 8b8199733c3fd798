"""Differential FUZZ testing: randomized filter → group-by → aggregate
specs run through the engine's generic grouped_agg pipeline AND DuckDB
on the same parquet, compared exactly.  Deterministic seeds; exercises
operator combinations no curated query pins (filter × key × multi-agg
× plan choice)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import duckdb
import ray
import ray.data

from engine.rayds.shuffle import grouped_agg

SF = "/root/testdata/sf0.001"

# (table, key candidates, int-exact value exprs as (name, np_fn, sql))
EVENTS_VALS = [
    ("cents", lambda t: np.rint(t["value"].to_numpy() * 100.0)
     .astype(np.int64), "CAST(round(value * 100) AS BIGINT)"),
    ("uid", lambda t: t["user_id"].to_numpy().astype(np.int64),
     "user_id"),
]
LINEITEM_VALS = [
    ("cents", lambda t: np.rint(t["l_extendedprice"].to_numpy() * 100.0)
     .astype(np.int64), "CAST(round(l_extendedprice * 100) AS BIGINT)"),
    ("qty", lambda t: np.rint(t["l_quantity"].to_numpy())
     .astype(np.int64), "CAST(round(l_quantity) AS BIGINT)"),
]
TABLES = {
    "events": (["event_type", "user_id"], EVENTS_VALS,
               [("user_id", "user_id", "int"),
                ("event_type", "event_type", "str")]),
    "lineitem": (["l_returnflag", "l_linestatus", "l_suppkey"],
                 LINEITEM_VALS,
                 [("l_suppkey", "l_suppkey", "int"),
                  ("l_returnflag", "l_returnflag", "str")]),
}
AGGS = [("sum", "sum"), ("min", "min"), ("max", "max")]


def _one_spec(rng, table):
    keys, vals, filts = TABLES[table]
    key = keys[rng.integers(len(keys))]
    vname, vfn, vsql = vals[rng.integers(len(vals))]
    nagg = 1 + int(rng.integers(2))
    aggs = [AGGS[i] for i in rng.choice(len(AGGS), size=nagg,
                                        replace=False)]
    fcol, fsql, ftype = filts[rng.integers(len(filts))]
    if ftype == "int":
        thresh = int(rng.integers(1, 80))
        fil = (fcol, thresh)
        fsql_expr = f"{fsql} % 97 <= {thresh}"
    else:
        fil = (fcol, None)
        fsql_expr = "TRUE"
    return key, (vname, vfn, vsql), aggs, fil, fsql_expr


@pytest.mark.parametrize("seed", range(12))
def test_fuzz_grouped_agg(ray_session, seed):
    rng = np.random.default_rng(seed)
    table = ("events", "lineitem")[seed % 2]
    key, (vname, vfn, vsql), aggs, (fcol, thresh), fsql = _one_spec(
        rng, table)
    plan = ("shuffle", "tree")[int(rng.integers(2))]

    ds = ray.data.read_parquet(f"{SF}/{table}.parquet")

    def prep(t: pa.Table) -> pa.Table:
        v = vfn(t)
        out = pa.table({key: t[key], "v": pa.array(v)})
        if thresh is not None:
            kv = t[fcol].to_numpy().astype(np.int64)
            out = out.filter(pa.array(kv % 97 <= thresh))
        return out

    rolled = grouped_agg(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None,
                       zero_copy_batch=True),
        [key], [("v", fn) for fn, _ in aggs],
        [f"v_{fn}" for fn, _ in aggs], plan=plan)
    got = pa.concat_tables(
        [b for b in rolled.iter_batches(batch_format="pyarrow")]
    ).to_pandas().sort_values(key, ignore_index=True)

    con = duckdb.connect()
    sel = ", ".join(f"CAST({fn}(x.v) AS BIGINT) AS v_{fn}"
                    for fn, _ in aggs)
    want = con.sql(f"""
        WITH x AS (SELECT {key}, {vsql} AS v
                   FROM '{SF}/{table}.parquet' WHERE {fsql})
        SELECT {key}, {sel} FROM x GROUP BY 1 ORDER BY 1
    """).df()
    assert len(got) == len(want), (key, aggs, plan)
    assert got[key].tolist() == want[key].tolist()
    for fn, _ in aggs:
        assert got[f"v_{fn}"].tolist() == want[f"v_{fn}"].tolist(), \
            (table, key, fn, plan)


JOINS = [
    # (left table, right table, lkey, rkey)
    ("lineitem", "orders", "l_orderkey", "o_orderkey"),
    ("lineitem", "part", "l_partkey", "p_partkey"),
    ("orders", "customer", "o_custkey", "c_custkey"),
]


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_equi_join(ray_session, seed):
    from engine.rayds.shuffle import equi_join

    rng = np.random.default_rng(100 + seed)
    lt, rt, lk, rk = JOINS[seed % len(JOINS)]
    join_type = ("inner", "left outer")[int(rng.integers(2))]
    # random selectivity on the RIGHT side drives the broadcast-vs-hash
    # plan choice through the adaptive probe
    rsel = int(rng.integers(5, 97))

    left = ray.data.read_parquet(f"{SF}/{lt}.parquet")
    right = ray.data.read_parquet(f"{SF}/{rt}.parquet")

    def lprep(t: pa.Table) -> pa.Table:
        return pa.table({lk: t[lk]})

    def rprep(t: pa.Table) -> pa.Table:
        kv = t[rk].to_numpy().astype(np.int64)
        return pa.table({rk: t[rk]}).filter(pa.array(kv % 97 <= rsel))

    j = equi_join(
        left.map_batches(lprep, batch_format="pyarrow",
                         batch_size=None),
        right.map_batches(rprep, batch_format="pyarrow",
                          batch_size=None),
        lk, rk, [], [], join_type=join_type)
    jt = pa.concat_tables(
        [b for b in j.iter_batches(batch_format="pyarrow")])
    got_n = jt.num_rows
    got_keys = sorted(jt["_k"].to_pylist())

    con = duckdb.connect()
    jt_sql = "JOIN" if join_type == "inner" else "LEFT JOIN"
    want = con.sql(f"""
        SELECT l.{lk} AS k
        FROM '{SF}/{lt}.parquet' l
        {jt_sql} (SELECT {rk} FROM '{SF}/{rt}.parquet'
                  WHERE {rk} % 97 <= {rsel}) r
          ON l.{lk} = r.{rk}
        ORDER BY 1
    """).df()["k"].tolist()
    assert got_n == len(want), (lt, rt, join_type, rsel)
    assert got_keys == want


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_outer_join_types(ray_session, seed):
    from engine.rayds.shuffle import equi_join

    rng = np.random.default_rng(200 + seed)
    lt, rt, lk, rk = JOINS[seed % len(JOINS)]
    join_type = ("right outer", "full outer")[seed % 2]
    lsel = int(rng.integers(5, 60))

    left = ray.data.read_parquet(f"{SF}/{lt}.parquet")
    right = ray.data.read_parquet(f"{SF}/{rt}.parquet")

    def lprep(t: pa.Table) -> pa.Table:
        kv = t[lk].to_numpy().astype(np.int64)
        out = pa.table({lk: t[lk], "lone": pa.array(
            np.ones(t.num_rows, dtype=np.int64))})
        return out.filter(pa.array(kv % 97 <= lsel))

    def rprep(t: pa.Table) -> pa.Table:
        return pa.table({rk: t[rk]})

    j = equi_join(
        left.map_batches(lprep, batch_format="pyarrow",
                         batch_size=None),
        right.map_batches(rprep, batch_format="pyarrow",
                          batch_size=None),
        lk, rk, ["lone"], [], join_type=join_type)
    jt = pa.concat_tables(
        [b for b in j.iter_batches(batch_format="pyarrow")])

    con = duckdb.connect()
    sqlj = ("RIGHT JOIN" if join_type == "right outer"
            else "FULL JOIN")
    want = con.sql(f"""
        SELECT count(*) AS n,
               CAST(coalesce(sum(CASE WHEN l.{lk} IS NULL
                                      THEN 1 ELSE 0 END), 0)
                    AS BIGINT) AS n_rnull
        FROM (SELECT {lk} FROM '{SF}/{lt}.parquet'
              WHERE {lk} % 97 <= {lsel}) l
        {sqlj} '{SF}/{rt}.parquet' r ON l.{lk} = r.{rk}
    """).df()
    assert jt.num_rows == int(want["n"][0]), (lt, rt, join_type)
    # unmatched-right rows have a NULL left payload
    got_null = jt["lone"].null_count
    assert got_null == int(want["n_rnull"][0]), (lt, rt, join_type)
