"""CRASH SWEEP at minimal scale: every registered query runs against a
tiny-but-complete synthetic sf dir (every table 2-40 rows, all event
types present, dates inside the TPC-H windows the queries use).  This
is where small-n edge bugs live — single-element groups, frames
smaller than their windows, single-day calendars, n=1 deciles — and a
query that crashes here would crash on a sparse production partition.
Results are NOT value-checked (the oracle harness owns that); the
contract is completion without an exception."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray
import ray.data


@pytest.fixture(scope="module")
def tiny_sf(tmp_path_factory):
    d = tmp_path_factory.mktemp("tinysf")
    rng = np.random.default_rng(7)

    def ts(dates):
        return pa.array(np.asarray(
            [np.datetime64(x, "us") for x in dates])
            .astype("datetime64[us]"))

    pq.write_table(pa.table({
        "r_regionkey": pa.array(np.arange(5, dtype=np.int32)),
        "r_name": pa.array(["AFRICA", "AMERICA", "ASIA", "EUROPE",
                            "MIDDLE EAST"]),
    }), str(d / "region.parquet"))
    pq.write_table(pa.table({
        "n_nationkey": pa.array(np.arange(10, dtype=np.int32)),
        "n_name": pa.array([f"NATION_{i}" for i in range(10)]),
        "n_regionkey": pa.array((np.arange(10) % 5).astype(np.int32)),
    }), str(d / "nation.parquet"))
    nc = 6
    pq.write_table(pa.table({
        "c_custkey": pa.array(np.arange(1, nc + 1, dtype=np.int64)),
        "c_name": pa.array([f"Customer#{i}" for i in range(nc)]),
        "c_nationkey": pa.array((np.arange(nc) % 10).astype(np.int32)),
        "c_acctbal": pa.array(rng.uniform(-100, 100, nc).round(2)),
        "c_mktsegment": pa.array(["BUILDING", "AUTOMOBILE"] * 3),
    }), str(d / "customer.parquet"))
    ns = 4
    pq.write_table(pa.table({
        "s_suppkey": pa.array(np.arange(1, ns + 1, dtype=np.int64)),
        "s_name": pa.array([f"S{i}" for i in range(ns)]),
        "s_nationkey": pa.array((np.arange(ns) % 10).astype(np.int32)),
        "s_acctbal": pa.array(rng.uniform(0, 100, ns).round(2)),
    }), str(d / "supplier.parquet"))
    npart = 8
    pq.write_table(pa.table({
        "p_partkey": pa.array(np.arange(1, npart + 1, dtype=np.int64)),
        "p_name": pa.array(["cold widget", "small widget", "large bolt",
                            "blue rod", "red rod", "big nut",
                            "tiny gear", "old cog"]),
        "p_brand": pa.array([f"Brand#{11 + (i % 4) * 11}"
                             for i in range(npart)]),
        "p_type": pa.array(["a", "b"] * 4),
        "p_size": pa.array((np.arange(npart) % 40 + 1)
                           .astype(np.int32)),
        "p_retailprice": pa.array(rng.uniform(10, 90, npart).round(2)),
    }), str(d / "part.parquet"))
    no = 12
    odates = ["1995-03-01", "1996-02-15", "1996-07-20", "1996-09-01",
              "1997-01-05", "1997-06-30"] * 2
    pq.write_table(pa.table({
        "o_orderkey": pa.array(np.arange(1, no + 1, dtype=np.int64)),
        "o_custkey": pa.array((np.arange(no) % nc + 1)
                              .astype(np.int64)),
        "o_orderstatus": pa.array(["F", "O"] * 6),
        "o_totalprice": pa.array(rng.uniform(100, 9000, no).round(2)),
        "o_orderdate": ts(odates),
        "o_orderpriority": pa.array(["1-URGENT", "3-MEDIUM",
                                     "5-LOW"] * 4),
    }), str(d / "orders.parquet"))
    nl = 40
    sdates = rng.choice(["1996-01-15", "1996-02-20", "1996-03-10",
                         "1996-08-05", "1997-02-01", "1998-01-10"],
                        size=nl)
    pq.write_table(pa.table({
        "l_orderkey": pa.array((np.arange(nl) % no + 1)
                               .astype(np.int64)),
        "l_partkey": pa.array((np.arange(nl) % npart + 1)
                              .astype(np.int64)),
        "l_suppkey": pa.array((np.arange(nl) % ns + 1)
                              .astype(np.int64)),
        "l_linenumber": pa.array(np.arange(nl, dtype=np.int32)),
        "l_quantity": pa.array(rng.integers(1, 50, nl)
                               .astype(np.float64)),
        "l_extendedprice": pa.array(rng.uniform(10, 5000, nl)
                                    .round(2)),
        "l_discount": pa.array(rng.integers(0, 11, nl) / 100.0),
        "l_tax": pa.array(np.zeros(nl)),
        "l_returnflag": pa.array(rng.choice(["R", "N", "A"],
                                            nl).tolist()),
        "l_linestatus": pa.array(rng.choice(["O", "F"], nl).tolist()),
        "l_shipdate": ts(sdates),
    }), str(d / "lineitem.parquet"))
    ne = 40
    base = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)
    ets = base + rng.integers(0, 20 * 86_400_000_000, ne)
    types = (["click", "purchase", "view", "signup", "error"] * 8)
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(ne, dtype=np.int64)),
        "ts": pa.array(ets.view("datetime64[us]")),
        "user_id": pa.array((np.arange(ne) % 5).astype(np.int64)),
        "event_type": pa.array(types),
        "value": pa.array(rng.uniform(0.5, 99, ne).round(2)),
        "props": pa.array(['{"k": %d}' % i for i in range(ne)]),
    }), str(d / "events.parquet"))
    ndoc = 12
    words = ["key", "agg", "row", "scan", "slow", "fast", "table",
             "value", "part", "hash"]
    texts = [" ".join(rng.choice(words, size=12)) for _ in range(ndoc)]
    texts[1] = texts[0]  # one exact dup
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(ndoc, dtype=np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(["en", "de"] * 6),
        "source": pa.array([f"s{i % 3}" for i in range(ndoc)]),
        "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
    }), str(d / "documents.parquet"))
    nv = 16
    emb = rng.normal(size=(nv, 8)).astype(np.float32)
    pq.write_table(pa.table({
        "vec_id": pa.array(np.arange(nv, dtype=np.int64)),
        "embedding": pa.array(list(emb), type=pa.list_(pa.float32())),
        "label": pa.array((np.arange(nv) % 3).astype(np.int32)),
    }), str(d / "embeddings.parquet"))
    return str(d)


def _groups():
    import __ray_entry__ as e

    names = sorted(e.queries().keys())
    k = 4
    return [names[i::k] for i in range(k)]


@pytest.mark.parametrize("part", range(4))
def test_tiny_smoke_all_queries(ray_session, tiny_sf, part):
    import __ray_entry__ as e

    qs = e.queries()
    failures = []
    for name in _groups()[part]:
        try:
            res = qs[name](tiny_sf)
            if isinstance(res, ray.data.Dataset):
                res.count()  # force execution
        except Exception as ex:  # noqa: BLE001 — collecting the sweep
            failures.append((name, f"{type(ex).__name__}: {ex}"))
    assert failures == []


@pytest.fixture(scope="module")
def tiny_sf_nowindow(tmp_path_factory, tiny_sf):
    """The same tiny corpus with every order/ship date pushed OUTSIDE
    the 1995-1998 windows the TPC-H-shaped queries filter on — every
    date-windowed query sees a legitimately EMPTY slice."""
    import shutil

    d = tmp_path_factory.mktemp("tinysf_nw")
    for f in ("region", "nation", "customer", "supplier", "part",
              "events", "documents", "embeddings"):
        shutil.copy(f"{tiny_sf}/{f}.parquet", str(d / f"{f}.parquet"))
    for f, col in (("orders", "o_orderdate"), ("lineitem",
                                               "l_shipdate")):
        t = pq.read_table(f"{tiny_sf}/{f}.parquet")
        shifted = pa.array(
            np.full(t.num_rows,
                    np.datetime64("2010-06-01T00:00:00", "us")))
        i = t.schema.get_field_index(col)
        t = t.set_column(i, col, shifted)
        pq.write_table(t, str(d / f"{f}.parquet"))
    return str(d)


WINDOWED = ["q3_topk", "q6_revenue", "q10_returned", "q15_top_supplier",
            "mkt_share", "promo_share", "local_supplier_revenue",
            "q4_priority", "open_orders_daily", "nation_flow"]


def test_empty_window_queries(ray_session, tiny_sf_nowindow):
    import __ray_entry__ as e

    qs = e.queries()
    failures = []
    for name in WINDOWED:
        try:
            res = qs[name](tiny_sf_nowindow)
            if isinstance(res, ray.data.Dataset):
                res.count()
        except Exception as ex:  # noqa: BLE001 — collecting the sweep
            failures.append((name, f"{type(ex).__name__}: {ex}"))
    assert failures == []
