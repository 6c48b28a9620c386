"""Relational operator coverage over the TPC-H-ish testdata: grouped
aggregates, broadcast-dim joins, big-big hash joins, semi-joins via
pre-aggregation, filter combinators, sorts/top-k, windowed running totals.

Parity targets in /root/reference: the aggregation jobs
(`indexer/aggr_jobs/disorder_jobs/daily_wallet_addresses_aggregates.sql:1-40`),
map-side joins (`indexer/jobs/export_contracts_job.py:50-58`), specification
filter combinators (`indexer/specification/specification.py:9-157`), ordered
top-k (`api/app/explorer/routes.py:431-1132`) and the cumulative period
aggregates (`indexer/aggr_jobs/order_jobs/period_wallet_addresses_aggregates.sql`).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads

from ray.data.aggregate import Count, Max, Mean, Min, Sum

from raycdc.queries import common as C


# -- Q1-style pricing summary (grouped aggregate with computed columns) ----

def q1_pricing_summary(sf_dir: str):
    """Grouped aggregate over a TINY key space (flag × status ≤ 6 groups):
    each batch emits its own per-group partial sums (Arrow compute + a
    C-speed pandas hash aggregate), so the only data movement is ≤ 6 rows
    per block — no all-to-all shuffle at any scale. Means decompose into
    (sum, count) partials and divide at the end. This is the combiner shape
    a 100-TB grouped aggregate with bounded key cardinality should have;
    ``Dataset.groupby().aggregate()`` (a full hash shuffle) is reserved for
    unbounded key spaces (see events_user_daily)."""
    ds = C.read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount", "l_tax"],
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        disc_price = pc.multiply(
            t.column("l_extendedprice"), pc.subtract(pa.scalar(1.0), t.column("l_discount"))
        )
        charge = pc.multiply(disc_price, pc.add(pa.scalar(1.0), t.column("l_tax")))
        df = pd.DataFrame(
            {
                "l_returnflag": t.column("l_returnflag").to_pandas(),
                "l_linestatus": t.column("l_linestatus").to_pandas(),
                "sum_qty": t.column("l_quantity").to_pandas(),
                "sum_base_price": t.column("l_extendedprice").to_pandas(),
                "sum_disc_price": disc_price.to_pandas(),
                "sum_charge": charge.to_pandas(),
                "sum_disc": t.column("l_discount").to_pandas(),
            }
        )
        out = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty=("sum_qty", "sum"),
            sum_base_price=("sum_base_price", "sum"),
            sum_disc_price=("sum_disc_price", "sum"),
            sum_charge=("sum_charge", "sum"),
            sum_disc=("sum_disc", "sum"),
            count_order=("sum_qty", "size"),
        )
        out["count_order"] = out["count_order"].astype("int64")
        return out

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = parts.groupby(["l_returnflag", "l_linestatus"], as_index=False).sum()
    out["avg_qty"] = out["sum_qty"] / out["count_order"]
    out["avg_disc"] = out["sum_disc"] / out["count_order"]
    out = out.drop(columns=["sum_disc"])
    out = out[
        ["l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
         "sum_disc_price", "sum_charge", "avg_qty", "avg_disc", "count_order"]
    ]
    return C.round_cols(
        out, ["sum_qty", "sum_base_price", "sum_disc_price", "sum_charge", "avg_qty", "avg_disc"]
    )


Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 4)                                   AS sum_qty,
       round(sum(l_extendedprice), 4)                              AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 4)           AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
       round(avg(l_quantity), 4)                                   AS avg_qty,
       round(avg(l_discount), 4)                                   AS avg_disc,
       count(*)                                                    AS count_order
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


# -- Q3-style: big-big hash join + groupby + deterministic top-k -----------

def q3_top_orders(sf_dir: str):
    cust = C.read_pandas(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    building = set(cust.loc[cust["c_mktsegment"] == "BUILDING", "c_custkey"])
    ref = C.broadcast(building)

    orders = C.read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])

    # stateless task (not an actor pool): the join's hash-shuffle aggregator
    # actors need CPUs too — a pinned pool upstream can deadlock a small node
    def filter_building(b: pd.DataFrame) -> pd.DataFrame:
        import ray

        return b[b["o_custkey"].isin(ray.get(ref))]

    orders = orders.map_batches(filter_building, batch_format="pandas")
    line = C.read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

    # per-batch revenue combiner BEFORE the join: lineitem carries ~4 rows
    # per order, so partial-summing by l_orderkey inside each batch cuts
    # the join's shuffle volume ~4x at any scale. The partial sums change
    # the summation tree vs the oracle's; 2-decimal doubles are NOT exact
    # in binary FP, but the accumulated relative error (~1e-12 over ~4-row
    # partials) sits far below the 1e-4 rounding quantum, so the rounded
    # top-10 boundary cannot flip. (Integer-cents partials would make it
    # exactly exact; unnecessary at this error margin.)
    def partial_rev(t: pa.Table) -> pd.DataFrame:
        rev = pc.multiply(
            t.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), t.column("l_discount")),
        )
        df = pd.DataFrame(
            {
                "l_orderkey": t.column("l_orderkey").to_numpy(),
                "revenue": rev.to_numpy(),
            }
        )
        return df.groupby("l_orderkey", as_index=False)["revenue"].sum()

    j = line.map_batches(partial_rev, batch_format="pyarrow").join(
        orders,
        join_type="inner",
        num_partitions=C.join_partitions(),
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    # round BEFORE ranking so the top-k boundary ranks on the same values
    # as the oracle (which orders by the rounded alias); per-block local
    # top-k (a superset of the global top-k) replaces the all-to-all sort —
    # the driver reduces ≤ 10 × blocks rows
    def localtop(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        df["revenue"] = df["revenue"].round(C.ROUND_DIGITS)
        return df.sort_values(
            ["revenue", "l_orderkey"], ascending=[False, True], kind="stable"
        ).head(10)

    cand = (
        j.groupby(["l_orderkey", "o_orderdate"])
        .aggregate(Sum("revenue", alias_name="revenue"))
        .map_batches(localtop, batch_format="pyarrow")
        .to_pandas()
    )
    top = (
        cand.sort_values(
            ["revenue", "l_orderkey"], ascending=[False, True], kind="stable"
        )
        .head(10)
        .reset_index(drop=True)
    )
    return top[["l_orderkey", "o_orderdate", "revenue"]]


Q3_SQL = """
SELECT l_orderkey, o_orderdate, round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM customer JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey LIMIT 10
"""


# -- Q5-style: chained broadcast-dim joins + groupby -----------------------

def q5_nation_revenue(sf_dir: str):
    def build_lut():
        nation = C.read_pandas(
            sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"]
        )
        region = C.read_pandas(sf_dir, "region", ["r_regionkey", "r_name"])
        supplier = C.read_pandas(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
        asia = nation.merge(region, left_on="n_regionkey", right_on="r_regionkey")
        asia = asia[asia["r_name"] == "ASIA"]
        sup = supplier.merge(asia, left_on="s_nationkey", right_on="n_nationkey")
        return dict(zip(sup["s_suppkey"], sup["n_name"]))

    # shared-KV-pinned broadcast (CacheDict analog): keyed by the identity
    # of every source table so a rewritten dim self-invalidates
    sig = ":".join(
        C.table_sig(sf_dir, t) for t in ("nation", "region", "supplier")
    )
    ref = C.broadcast_cached(
        f"q5-supnation-lut:{os.path.abspath(sf_dir)}:{sig}", build_lut
    )

    line = C.read(sf_dir, "lineitem", ["l_suppkey", "l_extendedprice", "l_discount"])

    class NationRevenue:
        def __init__(self):
            import ray

            self.lut = ray.get(ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            b = b[b["l_suppkey"].isin(self.lut)].copy()
            b["n_name"] = b["l_suppkey"].map(self.lut)
            b["revenue"] = b["l_extendedprice"] * (1 - b["l_discount"])
            # partial aggregate inside the batch → tiny shuffle (combiner)
            return b.groupby("n_name", as_index=False)["revenue"].sum()

    # the per-batch combiner leaves ≤ 5 rows per block — fold on the driver
    # instead of an all-to-all groupby over the tiny partials
    parts = line.map_batches(
        NationRevenue, batch_format="pandas", concurrency=(1, 8)
    ).to_pandas()
    out = parts.groupby("n_name", as_index=False)["revenue"].sum()
    return C.round_cols(out, ["revenue"])


Q5_SQL = """
SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
"""


# -- Q4-style: semi-join via pre-aggregated max (scale-safe EXISTS) --------

def order_priority_count(sf_dir: str):
    line = C.read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
    max_ship = line.groupby("l_orderkey").aggregate(Max("l_shipdate", alias_name="max_shipdate"))
    orders = C.read(sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"])
    j = orders.join(
        max_ship,
        join_type="inner",
        num_partitions=C.join_partitions(),
        on=("o_orderkey",),
        right_on=("l_orderkey",),
    )

    def late(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater(t.column("max_shipdate"), t.column("o_orderdate")))

    return (
        j.map_batches(late, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(Count(alias_name="order_count"))
        .to_pandas()
    )


Q4_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
"""


# -- top-k customers (join + top-k with deterministic tie-break) -----------

def top_customers_by_revenue(sf_dir: str):
    cust = C.read_pandas(sf_dir, "customer", ["c_custkey", "c_name"])
    ref = C.broadcast(dict(zip(cust["c_custkey"], cust["c_name"])))
    orders = C.read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    agg = orders.groupby("o_custkey").aggregate(
        Sum("o_totalprice", alias_name="revenue"), Count(alias_name="n_orders")
    )

    class AddName:
        def __init__(self):
            import ray

            self.lut = ray.get(ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            b["c_name"] = b["o_custkey"].map(self.lut)
            # round BEFORE ranking: rank on the oracle's rounded values;
            # keep only the block-local top-10 (superset of the global)
            b["revenue"] = b["revenue"].round(C.ROUND_DIGITS)
            return b.sort_values(
                ["revenue", "o_custkey"], ascending=[False, True], kind="stable"
            ).head(10)

    cand = agg.map_batches(
        AddName, batch_format="pandas", concurrency=(1, 4)
    ).to_pandas()
    top = (
        cand.sort_values(
            ["revenue", "o_custkey"], ascending=[False, True], kind="stable"
        )
        .head(10)
        .reset_index(drop=True)
    )
    return top[["o_custkey", "c_name", "revenue", "n_orders"]]


TOP_CUSTOMERS_SQL = """
SELECT o_custkey, c_name, round(sum(o_totalprice), 4) AS revenue, count(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY o_custkey, c_name
ORDER BY revenue DESC, o_custkey LIMIT 10
"""


# -- filter combinators (And/Or/Not specifications) ------------------------

def lineitem_filter_spec(sf_dir: str):
    """And(returnflag='R', Or(discount>0.06, quantity>45), Not(linestatus='F'))
    as one vectorized boolean mask — the Ray translation of the reference's
    Specification combinators (`indexer/specification/specification.py:9-157`)."""
    ds = C.read(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus", "l_discount", "l_quantity"],
    )

    def spec(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(
                pc.equal(t.column("l_returnflag"), "R"),
                pc.or_(
                    pc.greater(t.column("l_discount"), 0.06),
                    pc.greater(t.column("l_quantity"), 45.0),
                ),
            ),
            pc.invert(pc.equal(t.column("l_linestatus"), "F")),
        )
        return t.filter(m).select(["l_orderkey", "l_linenumber", "l_discount", "l_quantity"])

    return ds.map_batches(spec, batch_format="pyarrow")


FILTER_SPEC_SQL = """
SELECT l_orderkey, l_linenumber, l_discount, l_quantity
FROM lineitem
WHERE l_returnflag = 'R' AND (l_discount > 0.06 OR l_quantity > 45) AND NOT l_linestatus = 'F'
"""


# -- per-group running totals (ordered window / cumulative aggregate) ------

def customer_running_total(sf_dir: str):
    """Per-customer cumulative order value in (o_orderdate, o_orderkey)
    order — the pattern for the reference's strictly-sequential period
    aggregates (`indexer/aggr_jobs/order_jobs/order_job.py:13-24`).
    Bounded-partition shape: customers co-located by hash, one sort +
    Cython ``groupby().cumsum()`` per partition — never a Python call per
    customer (near-unique key at scale)."""
    orders = C.read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"])

    def running(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_custkey", "o_orderdate", "o_orderkey"], kind="stable")
        g["running_total"] = (
            g.groupby("o_custkey")["o_totalprice"].cumsum().round(2)
        )
        return g[["o_custkey", "o_orderkey", "running_total"]]

    return C.by_partition(orders, "o_custkey", running)


RUNNING_TOTAL_SQL = """
SELECT o_custkey, o_orderkey,
       round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS UNBOUNDED PRECEDING), 2) AS running_total
FROM orders
"""


# -- small-dim aggregate (customer per nation) -----------------------------

def nation_customer_stats(sf_dir: str):
    # shared-KV-pinned broadcast: every query in a driver pass that needs
    # the nation-name lut gets ONE object-store copy (CacheDict analog)
    def build_lut():
        nation = C.read_pandas(sf_dir, "nation", ["n_nationkey", "n_name"])
        return dict(zip(nation["n_nationkey"], nation["n_name"]))

    ref = C.broadcast_cached(
        f"nation-lut:{os.path.abspath(sf_dir)}:{C.table_sig(sf_dir, 'nation')}",
        build_lut,
    )
    cust = C.read(sf_dir, "customer", ["c_nationkey", "c_acctbal"])

    class AddNation:
        def __init__(self):
            import ray

            self.lut = ray.get(ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            b["n_name"] = b["c_nationkey"].map(self.lut)
            return b[["n_name", "c_acctbal"]]

    out = (
        cust.map_batches(AddNation, batch_format="pandas", concurrency=1)
        .groupby("n_name")
        .aggregate(
            Count(alias_name="n_customers"),
            Sum("c_acctbal", alias_name="sum_acctbal"),
            Min("c_acctbal", alias_name="min_acctbal"),
            Max("c_acctbal", alias_name="max_acctbal"),
        )
        .to_pandas()
    )
    return C.round_cols(out, ["sum_acctbal", "min_acctbal", "max_acctbal"])


NATION_CUSTOMER_SQL = """
SELECT n_name, count(*) AS n_customers,
       round(sum(c_acctbal), 4) AS sum_acctbal,
       round(min(c_acctbal), 4) AS min_acctbal,
       round(max(c_acctbal), 4) AS max_acctbal
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


# -- anti-join (NOT EXISTS) --------------------------------------------------

def customers_without_orders(sf_dir: str):
    """Distributed anti-join: customers with no URGENT order, via Ray's
    native hash-partitioned ``left_anti`` join — both sides shuffle once on
    the key, no broadcast of the (customer-sized, unbroadcastable at scale)
    order-key set; the right side is predicate-pruned AT THE READ. The
    NOT-EXISTS counterpart of the semi-join in ``order_priority_count``."""
    import pyarrow.dataset as pads

    cust = C.read(sf_dir, "customer", ["c_custkey", "c_name"])
    urgent = C.read(
        sf_dir, "orders", ["o_custkey"],
        filter=(pads.field("o_orderpriority") == "1-URGENT"),
    )
    return cust.join(
        urgent,
        join_type="left_anti",
        num_partitions=C.join_partitions(),
        on=("c_custkey",),
        right_on=("o_custkey",),
    )


ANTI_JOIN_SQL = """
SELECT c_custkey, c_name
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderpriority = '1-URGENT')
"""


# -- Bloom-pruned semi-join ----------------------------------------------------

_BLOOM_BITS = 1 << 17   # 16 KiB of bits — sized for ~10k keys at k=4
_BLOOM_K = 4


def _mix64(x: np.ndarray, salt: np.uint64) -> np.ndarray:
    """splitmix64-style avalanche over uint64 keys (vectorized, wrapping)."""
    z = x + (salt + np.uint64(0x9E3779B97F4A7C15))
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _bloom_indices(keys: np.ndarray) -> np.ndarray:
    """(n, k) bit indices via double hashing h1 + i*h2 (mod bits)."""
    u = keys.astype("int64").view("uint64")
    h1 = _mix64(u, np.uint64(1))
    h2 = _mix64(u, np.uint64(2)) | np.uint64(1)
    i = np.arange(_BLOOM_K, dtype="uint64")[None, :]
    return ((h1[:, None] + i * h2[:, None]) % np.uint64(_BLOOM_BITS)).astype(
        "int64"
    )


def urgent_revenue_bloom(sf_dir: str):
    """Revenue by return flag over lineitems of URGENT orders, with a Bloom
    filter pruning the probe side BEFORE the exact join.

    The 100-TB shape for semi-joins whose key set is too big to broadcast
    exactly but whose *bitset* is not: (1) the build side is pruned at the
    read and folded into per-block Bloom partials (one 16 KiB word-array row
    per block, OR-reduced on the driver — a mergeable sketch, like
    sketches.hll_registers); (2) the probe side tests the broadcast bits
    per batch (vectorized double-hashing) so only candidate rows — true
    matches plus the Bloom's ~e^-2 false-positive sliver — enter (3) the
    exact hash join that makes the output exact (which is what lets a plain
    JOIN SQL be the oracle). The final grouped aggregate is bounded-key,
    so per-batch partials + a driver fold finish it with no extra shuffle."""
    import ray

    urgent = C.read(
        sf_dir, "orders", ["o_orderkey"],
        filter=(pads.field("o_orderpriority") == "1-URGENT"),
    )

    def bloom_partial(b: pd.DataFrame) -> pd.DataFrame:
        words = np.zeros(_BLOOM_BITS // 64, dtype="uint64")
        idx = _bloom_indices(b["o_orderkey"].to_numpy()).ravel()
        np.bitwise_or.at(words, idx >> 6, np.uint64(1) << (idx.astype("uint64") & np.uint64(63)))
        return pd.DataFrame({"words": [words]})

    partials = urgent.map_batches(bloom_partial, batch_format="pandas").to_pandas()
    words = np.bitwise_or.reduce(np.stack(partials["words"].to_numpy()), axis=0)
    ref = C.broadcast(words)

    class BloomPrune:
        def __init__(self):
            self.words = ray.get(ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            idx = _bloom_indices(b["l_orderkey"].to_numpy())
            hit = np.ones(len(b), dtype=bool)
            for j in range(_BLOOM_K):
                bit = self.words[idx[:, j] >> 6] >> (
                    idx[:, j].astype("uint64") & np.uint64(63)
                )
                hit &= (bit & np.uint64(1)).astype(bool)
            return b.loc[hit]

    items = C.read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
    ).map_batches(BloomPrune, batch_format="pandas", concurrency=(1, 8))

    joined = items.join(
        urgent,
        join_type="inner",
        num_partitions=C.join_partitions(),
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def agg_partial(b: pd.DataFrame) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "l_returnflag": b["l_returnflag"],
                "revenue": b["l_extendedprice"] * (1.0 - b["l_discount"]),
                "n": np.int64(1),
            }
        )
        return df.groupby("l_returnflag", as_index=False).agg(
            revenue=("revenue", "sum"), n=("n", "sum")
        )

    parts = joined.map_batches(agg_partial, batch_format="pandas").to_pandas()
    out = parts.groupby("l_returnflag", as_index=False).agg(
        revenue=("revenue", "sum"), n=("n", "sum")
    )
    out["n"] = out["n"].astype("int64")
    return C.round_cols(out, ["revenue"])


BLOOM_SEMI_SQL = """
SELECT l_returnflag,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       count(*) AS n
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderpriority = '1-URGENT'
GROUP BY l_returnflag
"""


# -- Q6-style: forecast revenue change (pure filter + one global sum) -------

def q6_forecast_revenue(sf_dir: str):
    """TPC-H Q6: the purest filter-pushdown + global-reduce shape — every
    predicate (ship-date year, discount band, quantity cap) is pushed
    into row-group selection so non-qualifying rows never leave storage;
    per-batch partial sums reduce to one driver-side add of ≤ blocks
    floats. The float comparisons use the same double literals on both
    sides, so the selected row set is identical by construction."""
    import datetime as _dt

    line = C.read(
        sf_dir,
        "lineitem",
        ["l_extendedprice", "l_discount"],
        filter=(
            (pads.field("l_shipdate") >= _dt.datetime(1996, 1, 1))
            & (pads.field("l_shipdate") < _dt.datetime(1997, 1, 1))
            & (pads.field("l_discount") >= 0.05)
            & (pads.field("l_discount") <= 0.07)
            & (pads.field("l_quantity") < 24.0)
        ),
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        rev = pc.sum(
            pc.multiply(t.column("l_extendedprice"), t.column("l_discount"))
        ).as_py()
        return pd.DataFrame({"revenue": [rev if rev is not None else 0.0]})

    parts = line.map_batches(partial, batch_format="pyarrow").to_pandas()
    return pd.DataFrame({"revenue": [round(float(parts["revenue"].sum()), 4)]})


Q6_SQL = """
SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


# -- Q10-style: returned-item revenue report (top 20 customers) -------------

Q10_FROM = "1996-10-01"
Q10_TO = "1997-01-01"


def q10_returned_items(sf_dir: str):
    """TPC-H Q10: revenue lost to returned items per customer over one
    quarter. Filter-pushed reads on BOTH fact tables (only 'R' lineitem
    rows and in-window orders leave storage — row-group pruning at the
    source), per-batch revenue partials by orderkey BEFORE the big-big
    join (~4× shuffle cut, the q3 combiner), a second partial by custkey
    after it, then the global top-20 via per-block local-top-k combiners
    — no all-to-all sort. Customer/nation attributes resolve on the
    DRIVER against the 20 winning keys only (dim lookup after the top-k,
    never a corpus-wide join)."""
    import datetime as _dt

    orders = C.read(
        sf_dir,
        "orders",
        ["o_orderkey", "o_custkey"],
        filter=(
            (pads.field("o_orderdate") >= _dt.datetime(1996, 10, 1))
            & (pads.field("o_orderdate") < _dt.datetime(1997, 1, 1))
        ),
    )
    line = C.read(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_extendedprice", "l_discount"],
        filter=(pads.field("l_returnflag") == "R"),
    )

    def partial_rev(t: pa.Table) -> pd.DataFrame:
        rev = pc.multiply(
            t.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), t.column("l_discount")),
        )
        df = pd.DataFrame(
            {
                "l_orderkey": t.column("l_orderkey").to_numpy(),
                "revenue": rev.to_numpy(),
            }
        )
        return df.groupby("l_orderkey", as_index=False)["revenue"].sum()

    j = line.map_batches(partial_rev, batch_format="pyarrow").join(
        orders,
        join_type="inner",
        num_partitions=C.join_partitions(),
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def partial_cust(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("o_custkey", as_index=False)["revenue"].sum()

    agg = (
        j.map_batches(partial_cust, batch_format="pandas")
        .groupby("o_custkey")
        .aggregate(Sum("revenue", alias_name="revenue"))
    )

    def localtop(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["revenue"] = b["revenue"].round(C.ROUND_DIGITS)
        return b.sort_values(
            ["revenue", "o_custkey"], ascending=[False, True], kind="stable"
        ).head(20)

    cand = agg.map_batches(localtop, batch_format="pandas").to_pandas()
    top = (
        cand.sort_values(
            ["revenue", "o_custkey"], ascending=[False, True], kind="stable"
        )
        .head(20)
        .reset_index(drop=True)
    )
    cust = C.read_pandas(
        sf_dir, "customer", ["c_custkey", "c_name", "c_nationkey"]
    ).set_index("c_custkey")
    nat = C.read_pandas(sf_dir, "nation", ["n_nationkey", "n_name"])
    nname = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))
    keys = top["o_custkey"].astype(int)
    return pd.DataFrame(
        {
            "c_custkey": keys.astype("int64"),
            "c_name": [cust.loc[k, "c_name"] for k in keys],
            "n_name": [nname[int(cust.loc[k, "c_nationkey"])] for k in keys],
            "revenue": top["revenue"],
        }
    )


Q10_SQL = f"""
WITH rev AS (
  SELECT o_custkey, round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_returnflag = 'R'
    AND o_orderdate >= TIMESTAMP '{Q10_FROM}'
    AND o_orderdate <  TIMESTAMP '{Q10_TO}'
  GROUP BY o_custkey
)
SELECT c_custkey, c_name, n_name, revenue
FROM rev
JOIN customer ON c_custkey = o_custkey
JOIN nation ON n_nationkey = c_nationkey
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q10_returned_items": q10_returned_items,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q3_top_orders": q3_top_orders,
    "q5_nation_revenue": q5_nation_revenue,
    "order_priority_count": order_priority_count,
    "top_customers_by_revenue": top_customers_by_revenue,
    "lineitem_filter_spec": lineitem_filter_spec,
    "customer_running_total": customer_running_total,
    "nation_customer_stats": nation_customer_stats,
    "customers_without_orders": customers_without_orders,
    "urgent_revenue_bloom": urgent_revenue_bloom,
}

ORACLE_SQL = {
    "q1_pricing_summary": Q1_SQL,
    "q10_returned_items": Q10_SQL,
    "q6_forecast_revenue": Q6_SQL,
    "q3_top_orders": Q3_SQL,
    "q5_nation_revenue": Q5_SQL,
    "order_priority_count": Q4_SQL,
    "top_customers_by_revenue": TOP_CUSTOMERS_SQL,
    "lineitem_filter_spec": FILTER_SPEC_SQL,
    "customer_running_total": RUNNING_TOTAL_SQL,
    "nation_customer_stats": NATION_CUSTOMER_SQL,
    "customers_without_orders": ANTI_JOIN_SQL,
    "urgent_revenue_bloom": BLOOM_SEMI_SQL,
}
