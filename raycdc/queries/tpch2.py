"""Second tranche of relational coverage (TPC-H Q7/Q13/Q14/Q15/Q17/Q18/Q19
shapes adapted to the testdata's columns — no partsupp/shipmode/container
in the driver tables, so predicates bind to the columns that exist).

Each query is the canonical Ray-Data scale shape for its class:
  * Q7  — two broadcast dimension filters + ONE big-big hash join, with
    per-batch partials on both sides of the join (the q3/q10 combiner).
  * Q13 — left-join-as-arithmetic: the zero bucket comes from a parquet
    FOOTER row count, never a customer-corpus join.
  * Q14 — broadcast dense bitmap + global conditional reduce.
  * Q15 — dim-keyed aggregate → driver argmax over a dim-sized result.
  * Q17 — the correlated-subquery class done as two pruned passes with a
    broadcast per-key threshold map between them.
  * Q18 — HAVING on a fact-keyed aggregate; winners (O(qualifying)) drive
    key-pruned reads of the other tables, never a corpus join.
  * Q19 — disjunctive multi-band predicate vectorized via a broadcast
    per-key band id array.

Parity targets in /root/reference: grouped SQL aggregates
(`indexer/aggr_jobs/disorder_jobs/daily_wallet_addresses_aggregates.sql`),
map-side dict joins (`indexer/jobs/export_contracts_job.py:50-58`),
specification filters (`indexer/specification/specification.py:9-157`).
"""

from __future__ import annotations

import datetime as _dt

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads

import ray
from ray.data.aggregate import Sum

from raycdc.queries import common as C


# -- Q7: volume shipping between two nations --------------------------------

# both nations carry suppliers at every testdata tier (sf0.001's 10
# suppliers cover only a third of the nation space)
Q7_N1, Q7_N2 = "NATION_3", "NATION_12"
Q7_FROM, Q7_TO = "1996-01-01", "1998-01-01"


def q7_volume_shipping(sf_dir: str):
    """Revenue shipped between two nations by year. Both dimension paths
    (supplier→nation, customer→nation) are broadcast as FILTERED lookup
    dicts — only keys in the two target nations ship to workers (2/25 of
    each dim), so each fact batch drops ~92% of its rows map-side before
    the single big-big equi-join on orderkey. Partials run by
    (orderkey, supp_nation, year) pre-join (the q10 shuffle cut) and by
    the 2×2×years tiny key space post-join, so the final fold moves a few
    dozen rows. The join itself is the house TAGGED CO-SHUFFLE (both
    sides conformed to one schema, shuffled once on bounded
    ``part_ids(orderkey)``, one vectorized pandas merge per partition)
    rather than ``Dataset.join``: Ray 2.49's hash-shuffle join finalizes
    a partition that received zero blocks from one side as a SCHEMA-LESS
    table and Acero then fails on the missing key field (the
    neardup_clusters r03 failure mode — sparse key spaces at small scale
    make empty partitions near-certain). Same scale shape: each side
    moves exactly once. At a scale where the filtered customer LUT
    outgrows a broadcast, the orders mapper becomes this union's second
    side unfiltered — nothing else changes."""
    nat = C.read_pandas(sf_dir, "nation", ["n_nationkey", "n_name"])
    nk = {
        int(k): v
        for k, v in zip(nat["n_nationkey"], nat["n_name"])
        if v in (Q7_N1, Q7_N2)
    }
    sup = C.read_pandas(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    supp_nat = {
        int(s): nk[int(n)]
        for s, n in zip(sup["s_suppkey"], sup["s_nationkey"])
        if int(n) in nk
    }
    cust = C.read_pandas(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    cust_nat = {
        int(c): nk[int(n)]
        for c, n in zip(cust["c_custkey"], cust["c_nationkey"])
        if int(n) in nk
    }
    sref, cref = C.broadcast(supp_nat), C.broadcast(cust_nat)

    # one tagged schema for BOTH co-shuffle sides: side 0 = lineitem
    # partial (nation = supplier's), side 1 = order (nation = customer's)
    tagged = pa.schema(
        [
            ("key", pa.int64()),
            ("nation", pa.string()),
            ("l_year", pa.int64()),
            ("volume", pa.float64()),
            ("side", pa.int8()),
        ]
    )

    def attach_cust(t: pa.Table) -> pa.Table:
        lut = ray.get(cref)
        ok = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        cn = pd.Series(t.column("o_custkey").to_numpy(zero_copy_only=False)).map(lut)
        m = cn.notna().to_numpy()
        n = int(m.sum())
        return pa.table(
            {
                "key": ok[m].astype(np.int64),
                "nation": cn.to_numpy(dtype=object)[m],
                "l_year": np.zeros(n, np.int64),
                "volume": np.zeros(n, np.float64),
                "side": np.ones(n, np.int8),
            },
            schema=tagged,
        )

    orders = C.read(sf_dir, "orders", ["o_orderkey", "o_custkey"]).map_batches(
        attach_cust, batch_format="pyarrow"
    )

    def partial_line(t: pa.Table) -> pa.Table:
        lut = ray.get(sref)
        sn = pd.Series(t.column("l_suppkey").to_numpy(zero_copy_only=False)).map(lut)
        m = sn.notna().to_numpy()
        if not m.any():
            return tagged.empty_table()
        df = pd.DataFrame(
            {
                "key": t.column("l_orderkey").to_numpy(zero_copy_only=False)[m],
                "nation": sn.to_numpy(dtype=object)[m],
                "l_year": pc.year(t.column("l_shipdate")).to_numpy(zero_copy_only=False)[m],
                "volume": (
                    t.column("l_extendedprice").to_numpy(zero_copy_only=False)
                    * (1.0 - t.column("l_discount").to_numpy(zero_copy_only=False))
                )[m],
            }
        )
        out = df.groupby(["key", "nation", "l_year"], as_index=False)["volume"].sum()
        return pa.table(
            {
                "key": out["key"].to_numpy(np.int64),
                "nation": out["nation"].to_numpy(dtype=object),
                "l_year": out["l_year"].to_numpy(np.int64),
                "volume": out["volume"].to_numpy(np.float64),
                "side": np.zeros(len(out), np.int8),
            },
            schema=tagged,
        )

    line = C.read(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
        filter=(
            (pads.field("l_shipdate") >= _dt.datetime(1996, 1, 1))
            & (pads.field("l_shipdate") < _dt.datetime(1998, 1, 1))
        ),
    ).map_batches(partial_line, batch_format="pyarrow")

    def merge_pairs(g: pd.DataFrame) -> pd.DataFrame:
        e = g[g["side"] == 0]
        o = g.loc[g["side"] == 1, ["key", "nation"]].rename(
            columns={"nation": "cust_nation"}
        )
        m = e.merge(o, on="key", how="inner")
        m = m[m["nation"] != m["cust_nation"]]
        out = m.groupby(["nation", "cust_nation", "l_year"], as_index=False)[
            "volume"
        ].sum()
        return pd.DataFrame(
            {
                "supp_nation": out["nation"].astype(object),
                "cust_nation": out["cust_nation"].astype(object),
                "l_year": out["l_year"].astype("int64"),
                "volume": out["volume"].astype("float64"),
            }
        )

    parts = C.by_partition(line.union(orders), "key", merge_pairs).to_pandas()
    if len(parts) == 0:  # no qualifying pair anywhere: typed empty result
        parts = pd.DataFrame(
            {
                "supp_nation": pd.Series([], dtype=object),
                "cust_nation": pd.Series([], dtype=object),
                "l_year": pd.Series([], dtype="int64"),
                "volume": pd.Series([], dtype="float64"),
            }
        )
    out = parts.groupby(
        ["supp_nation", "cust_nation", "l_year"], as_index=False
    )["volume"].sum()
    out = out.rename(columns={"volume": "revenue"})
    out["l_year"] = out["l_year"].astype("int64")
    out = C.round_cols(out, ["revenue"])
    return out.sort_values(
        ["supp_nation", "cust_nation", "l_year"], kind="stable"
    ).reset_index(drop=True)


Q7_SQL = f"""
SELECT supp_nation, cust_nation, l_year, round(sum(volume), 4) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM lineitem
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = '{Q7_N1}' AND n2.n_name = '{Q7_N2}')
      OR (n1.n_name = '{Q7_N2}' AND n2.n_name = '{Q7_N1}'))
    AND l_shipdate >= TIMESTAMP '{Q7_FROM}'
    AND l_shipdate <  TIMESTAMP '{Q7_TO}'
)
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


# -- Q13: customer order-count distribution ---------------------------------

def q13_customer_distribution(sf_dir: str):
    """Distribution of per-customer order counts INCLUDING zero-order
    customers — the left-join-with-absent-keys class. The join never
    happens: counts come from a custkey-grouped aggregate over orders
    alone; the zero bucket is total customers (one parquet FOOTER read —
    zero data IO) minus the number of distinct ordering customers (the
    aggregate's cardinality, folded as per-block histogram partials, not
    materialized rows). Driver state is O(distinct counts), never
    O(customers)."""
    import os

    import pyarrow.parquet as pq

    n_cust = pq.ParquetFile(
        os.path.join(sf_dir, "customer.parquet")
    ).metadata.num_rows

    orders = C.read(sf_dir, "orders", ["o_custkey"])

    def partial_count(b: pd.DataFrame) -> pd.DataFrame:
        out = b.groupby("o_custkey", as_index=False).size()
        return out.rename(columns={"size": "c_count"})

    # custkey is near-unique → fold per bounded partition (the native hash
    # aggregate shuffles O(customers) keys); each partition emits only its
    # count-of-counts histogram (≤ distinct order counts rows)
    def partial_hist(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("o_custkey", as_index=False)["c_count"].sum()
        h = s["c_count"].value_counts().reset_index()
        h.columns = ["c_count", "custdist"]
        return h

    hist = C.by_partition(
        orders.map_batches(partial_count, batch_format="pandas"),
        "o_custkey",
        partial_hist,
    ).to_pandas()
    out = hist.groupby("c_count", as_index=False)["custdist"].sum()
    zero = n_cust - int(out["custdist"].sum())
    if zero > 0:
        out = pd.concat(
            [out, pd.DataFrame({"c_count": [0], "custdist": [zero]})],
            ignore_index=True,
        )
    out["c_count"] = out["c_count"].astype("int64")
    out["custdist"] = out["custdist"].astype("int64")
    return out.sort_values(
        ["custdist", "c_count"], ascending=[False, False], kind="stable"
    ).reset_index(drop=True)


Q13_SQL = """
WITH per_cust AS (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON o_custkey = c_custkey
  GROUP BY c_custkey
)
SELECT c_count, count(*) AS custdist
FROM per_cust GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# -- Q14: promo revenue share ------------------------------------------------

Q14_FROM, Q14_TO = "1996-09-01", "1996-10-01"


def q14_promo_revenue(sf_dir: str):
    """Share of one month's revenue from promo-type parts. The part
    dimension ships once as a DENSE boolean bitmap (partkeys are dense
    ints — one bit per part, ~125 KB per million parts), so the fact scan
    is a pushdown-pruned read + one vectorized gather per batch; partials
    reduce to two floats per block."""
    part = C.read_pandas(sf_dir, "part", ["p_partkey", "p_type"])
    bm = np.zeros(int(part["p_partkey"].max()) + 1, dtype=bool)
    bm[part.loc[part["p_type"] == "PROMO", "p_partkey"].to_numpy()] = True
    ref = C.broadcast(bm)

    def partial(t: pa.Table) -> pd.DataFrame:
        promo = ray.get(ref)
        rev = (
            t.column("l_extendedprice").to_numpy(zero_copy_only=False)
            * (1.0 - t.column("l_discount").to_numpy(zero_copy_only=False))
        )
        isp = promo[t.column("l_partkey").to_numpy(zero_copy_only=False)]
        return pd.DataFrame(
            {"promo": [float(rev[isp].sum())], "total": [float(rev.sum())]}
        )

    line = C.read(
        sf_dir,
        "lineitem",
        ["l_partkey", "l_extendedprice", "l_discount"],
        filter=(
            (pads.field("l_shipdate") >= _dt.datetime(1996, 9, 1))
            & (pads.field("l_shipdate") < _dt.datetime(1996, 10, 1))
        ),
    )
    parts = line.map_batches(partial, batch_format="pyarrow").to_pandas()
    share = 100.0 * parts["promo"].sum() / parts["total"].sum()
    return pd.DataFrame({"promo_revenue": [round(float(share), C.ROUND_DIGITS)]})


Q14_SQL = f"""
SELECT round(
  100.0 * sum(CASE WHEN p_type = 'PROMO'
                   THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
        / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE l_shipdate >= TIMESTAMP '{Q14_FROM}'
  AND l_shipdate <  TIMESTAMP '{Q14_TO}'
"""


# -- Q15: top supplier(s) by quarterly revenue -------------------------------

Q15_FROM, Q15_TO = "1996-01-01", "1996-04-01"


def q15_top_supplier(sf_dir: str):
    """Supplier(s) hitting the max quarterly revenue. Per-batch partials
    by suppkey (supplier-dim-keyed, bounded), a dim-sized grouped sum,
    then the argmax and name lookup run on the DRIVER over a dim-sized
    frame — the 'create view revenue0' of TPC-H Q15 without a second
    fact pass. Rounding to 4 digits happens BEFORE the max comparison on
    both sides so FP summation order can't flip a tie."""

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "supplier_no": t.column("l_suppkey").to_numpy(zero_copy_only=False),
                "total_revenue": (
                    t.column("l_extendedprice").to_numpy(zero_copy_only=False)
                    * (1.0 - t.column("l_discount").to_numpy(zero_copy_only=False))
                ),
            }
        )
        return df.groupby("supplier_no", as_index=False)["total_revenue"].sum()

    line = C.read(
        sf_dir,
        "lineitem",
        ["l_suppkey", "l_extendedprice", "l_discount"],
        filter=(
            (pads.field("l_shipdate") >= _dt.datetime(1996, 1, 1))
            & (pads.field("l_shipdate") < _dt.datetime(1996, 4, 1))
        ),
    )
    rev = (
        line.map_batches(partial, batch_format="pyarrow")
        .groupby("supplier_no")
        .aggregate(Sum("total_revenue", alias_name="total_revenue"))
        .to_pandas()
    )
    rev["total_revenue"] = rev["total_revenue"].round(C.ROUND_DIGITS)
    top = rev[rev["total_revenue"] == rev["total_revenue"].max()]
    sup = C.read_pandas(sf_dir, "supplier", ["s_suppkey", "s_name"])
    names = dict(zip(sup["s_suppkey"].astype(int), sup["s_name"]))
    out = pd.DataFrame(
        {
            "s_suppkey": top["supplier_no"].astype("int64"),
            "s_name": [names[int(k)] for k in top["supplier_no"]],
            "total_revenue": top["total_revenue"],
        }
    )
    return out.sort_values("s_suppkey", kind="stable").reset_index(drop=True)


Q15_SQL = f"""
WITH revenue0 AS (
  SELECT l_suppkey AS supplier_no,
         round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{Q15_FROM}'
    AND l_shipdate <  TIMESTAMP '{Q15_TO}'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue0 ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue0)
ORDER BY s_suppkey
"""


# -- Q17: small-quantity-order revenue (correlated subquery) ------------------

Q17_BRAND = "Brand#16"


def q17_small_quantity_revenue(sf_dir: str):
    """Average yearly revenue lost if small-quantity orders of one brand's
    parts were not filled — TPC-H's correlated-subquery class
    (l_quantity < 0.2 * per-part avg). Two passes over the SAME key-pruned
    read (the brand's partkeys push into the scan as an `isin`): pass 1
    folds per-part (sum, count) partials into a brand-sized threshold map,
    broadcast once; pass 2 applies the per-row threshold vectorized and
    reduces to one float per block. Quantities are integer-valued, so
    sum/count is order-independent in fp64 and both sides compute the
    identical threshold."""
    part = C.read_pandas(
        sf_dir, "part", ["p_partkey", "p_brand"],
        filters=[("p_brand", "==", Q17_BRAND)],
    )
    keys = part["p_partkey"].to_numpy(dtype=np.int64)
    pred = pads.field("l_partkey").isin(pa.array(keys))
    cols = ["l_partkey", "l_quantity", "l_extendedprice"]

    def partial_avg(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "l_partkey": t.column("l_partkey").to_numpy(zero_copy_only=False),
                "s": t.column("l_quantity").to_numpy(zero_copy_only=False),
            }
        )
        return df.groupby("l_partkey", as_index=False).agg(
            s=("s", "sum"), n=("s", "size")
        )

    parts = (
        C.read(sf_dir, "lineitem", cols, filter=pred)
        .map_batches(partial_avg, batch_format="pyarrow")
        .to_pandas()
    )
    agg = parts.groupby("l_partkey", as_index=False).sum()
    thresh = np.zeros(int(keys.max()) + 1, dtype=np.float64)
    thresh[agg["l_partkey"].to_numpy(dtype=np.int64)] = (
        0.2 * agg["s"].to_numpy() / agg["n"].to_numpy()
    )
    tref = C.broadcast(thresh)

    def partial_rev(t: pa.Table) -> pd.DataFrame:
        th = ray.get(tref)
        q = t.column("l_quantity").to_numpy(zero_copy_only=False)
        k = t.column("l_partkey").to_numpy(zero_copy_only=False)
        m = q < th[k]
        s = t.column("l_extendedprice").to_numpy(zero_copy_only=False)[m].sum()
        return pd.DataFrame({"s": [float(s)]})

    tot = (
        C.read(sf_dir, "lineitem", cols, filter=pred)
        .map_batches(partial_rev, batch_format="pyarrow")
        .to_pandas()["s"]
        .sum()
    )
    return pd.DataFrame({"avg_yearly": [round(float(tot) / 7.0, C.ROUND_DIGITS)]})


Q17_SQL = f"""
SELECT round(sum(l_extendedprice) / 7.0, 4) AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = '{Q17_BRAND}'
  AND l_quantity < (
    SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
    WHERE l2.l_partkey = p_partkey
  )
"""


# -- Q18: large-volume customers ---------------------------------------------

Q18_QTY = 300.0


def q18_large_volume_customers(sf_dir: str):
    """Orders whose total quantity exceeds a threshold (HAVING over a
    fact-keyed aggregate), decorated with customer/order attributes. The
    aggregate's qualifying set is O(output) — tiny by construction — so
    the orders and customer tables are read KEY-PRUNED (`in` filters at
    the parquet layer) against the winner keys; no corpus-sized join
    runs anywhere. Output capped at 100 like the spec."""

    def partial_qty(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "o_orderkey": t.column("l_orderkey").to_numpy(zero_copy_only=False),
                "sum_qty": t.column("l_quantity").to_numpy(zero_copy_only=False),
            }
        )
        return df.groupby("o_orderkey", as_index=False)["sum_qty"].sum()

    partials = C.read(
        sf_dir, "lineitem", ["l_orderkey", "l_quantity"]
    ).map_batches(partial_qty, batch_format="pyarrow")

    # HAVING inside the bounded-partition kernel — orderkey is near-unique,
    # so the native hash aggregate would shuffle O(orders) keys (measured
    # 25× slower at sf0.1); here only the O(output) winners leave the fold
    def having(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("o_orderkey", as_index=False)["sum_qty"].sum()
        return s[s["sum_qty"] > Q18_QTY]

    winners = C.by_partition(partials, "o_orderkey", having).to_pandas()
    if len(winners) == 0:
        return pd.DataFrame(
            {
                "c_name": pd.Series([], dtype=object),
                "c_custkey": pd.Series([], dtype="int64"),
                "o_orderkey": pd.Series([], dtype="int64"),
                "o_orderdate": pd.Series([], dtype="datetime64[us]"),
                "o_totalprice": pd.Series([], dtype="float64"),
                "sum_qty": pd.Series([], dtype="float64"),
            }
        )
    okeys = winners["o_orderkey"].astype(int).tolist()
    orders = C.read_pandas(
        sf_dir,
        "orders",
        ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
        filters=[("o_orderkey", "in", okeys)],
    )
    merged = orders.merge(winners, on="o_orderkey")
    cust = C.read_pandas(
        sf_dir,
        "customer",
        ["c_custkey", "c_name"],
        filters=[("c_custkey", "in", merged["o_custkey"].astype(int).tolist())],
    )
    merged = merged.merge(cust, left_on="o_custkey", right_on="c_custkey")
    merged = merged.sort_values(
        ["o_totalprice", "o_orderdate", "o_orderkey"],
        ascending=[False, True, True],
        kind="stable",
    ).head(100)
    out = merged[
        ["c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty"]
    ].reset_index(drop=True)
    out["c_custkey"] = out["c_custkey"].astype("int64")
    out["o_orderkey"] = out["o_orderkey"].astype("int64")
    return C.round_cols(out, ["o_totalprice", "sum_qty"])


Q18_SQL = f"""
WITH big AS (
  SELECT l_orderkey, sum(l_quantity) AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(l_quantity) > {Q18_QTY}
)
SELECT c_name, c_custkey, o_orderkey, o_orderdate,
       round(o_totalprice, 4) AS o_totalprice, round(sum_qty, 4) AS sum_qty
FROM big
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
LIMIT 100
"""


# -- Q19: disjunctive brand/size/quantity band revenue ------------------------

# (brand, max p_size, l_quantity band) — the three OR'd predicate bands
Q19_BANDS = [
    ("Brand#12", 5, 1.0, 11.0),
    ("Brand#23", 10, 10.0, 20.0),
    ("Brand#15", 15, 20.0, 30.0),
]


def q19_banded_revenue(sf_dir: str):
    """Revenue under a disjunction of (brand, size, quantity-band)
    predicates — the multi-band OR class that defeats naive pushdown. The
    part side collapses to a broadcast per-partkey band-id array (int8,
    dense keys); each fact batch gathers its band ids and applies the
    per-band quantity window via two aligned lookup arrays — one
    vectorized pass, no join, no per-band rescans. The quantity envelope
    (the union of all bands) still pushes into the scan, so out-of-band
    rows never leave storage."""
    part = C.read_pandas(sf_dir, "part", ["p_partkey", "p_brand", "p_size"])
    band = np.full(int(part["p_partkey"].max()) + 1, -1, dtype=np.int8)
    for i, (brand, max_size, _, _) in enumerate(Q19_BANDS):
        sel = (part["p_brand"] == brand) & (part["p_size"] >= 1) & (
            part["p_size"] <= max_size
        )
        band[part.loc[sel, "p_partkey"].to_numpy()] = i
    qlo = np.array([b[2] for b in Q19_BANDS] + [np.inf])
    qhi = np.array([b[3] for b in Q19_BANDS] + [-np.inf])
    ref = C.broadcast((band, qlo, qhi))

    env_lo = min(b[2] for b in Q19_BANDS)
    env_hi = max(b[3] for b in Q19_BANDS)

    def partial(t: pa.Table) -> pd.DataFrame:
        bd, lo, hi = ray.get(ref)
        k = t.column("l_partkey").to_numpy(zero_copy_only=False)
        q = t.column("l_quantity").to_numpy(zero_copy_only=False)
        b = bd[k]
        m = (q >= lo[b]) & (q <= hi[b])
        rev = (
            t.column("l_extendedprice").to_numpy(zero_copy_only=False)
            * (1.0 - t.column("l_discount").to_numpy(zero_copy_only=False))
        )
        return pd.DataFrame({"revenue": [float(rev[m].sum())]})

    line = C.read(
        sf_dir,
        "lineitem",
        ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
        filter=(
            (pads.field("l_quantity") >= env_lo)
            & (pads.field("l_quantity") <= env_hi)
        ),
    )
    parts = line.map_batches(partial, batch_format="pyarrow").to_pandas()
    return pd.DataFrame(
        {"revenue": [round(float(parts["revenue"].sum()), C.ROUND_DIGITS)]}
    )


def _q19_sql() -> str:
    ors = " OR ".join(
        f"(p_brand = '{brand}' AND p_size BETWEEN 1 AND {sz}"
        f" AND l_quantity BETWEEN {lo} AND {hi})"
        for brand, sz, lo, hi in Q19_BANDS
    )
    return f"""
SELECT round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE {ors}
"""


# -- Q8: national market share ------------------------------------------------

Q8_NATION = "NATION_3"
Q8_TYPE = "ECONOMY"


def q8_market_share(sf_dir: str):
    """Share of one nation's suppliers in a part-type's revenue sold into
    that nation's region, by year. Three broadcast dimension artifacts —
    a part-type bitmap, a supplier-nation bitmap, and a region-filtered
    customer set — shrink both fact sides map-side; the orderkey
    equi-join is the q7 tagged co-shuffle; the final fold moves two
    floats per (partition, year). The numerator rides WITH the volume
    partial (one pass computes both sums), so the share is one driver
    division per year."""
    nat = C.read_pandas(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"])
    region_key = int(nat.loc[nat["n_name"] == Q8_NATION, "n_regionkey"].iloc[0])
    region_nations = set(
        int(k) for k in nat.loc[nat["n_regionkey"] == region_key, "n_nationkey"]
    )
    n3_key = int(nat.loc[nat["n_name"] == Q8_NATION, "n_nationkey"].iloc[0])

    part = C.read_pandas(sf_dir, "part", ["p_partkey", "p_type"])
    pbm = np.zeros(int(part["p_partkey"].max()) + 1, dtype=bool)
    pbm[part.loc[part["p_type"] == Q8_TYPE, "p_partkey"].to_numpy()] = True

    sup = C.read_pandas(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    sbm = np.zeros(int(sup["s_suppkey"].max()) + 1, dtype=bool)
    sbm[sup.loc[sup["s_nationkey"] == n3_key, "s_suppkey"].to_numpy()] = True

    cust = C.read_pandas(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    cbm = np.zeros(int(cust["c_custkey"].max()) + 1, dtype=bool)
    in_region = cust["c_nationkey"].isin(list(region_nations)).to_numpy()
    cbm[cust.loc[in_region, "c_custkey"].to_numpy()] = True
    pref, sref2, cref2 = C.broadcast(pbm), C.broadcast(sbm), C.broadcast(cbm)

    tagged = pa.schema(
        [
            ("key", pa.int64()),
            ("l_year", pa.int64()),
            ("volume", pa.float64()),
            ("vol_nat", pa.float64()),
            ("side", pa.int8()),
        ]
    )

    def keep_orders(t: pa.Table) -> pa.Table:
        ck = ray.get(cref2)
        cu = t.column("o_custkey").to_numpy(zero_copy_only=False)
        m = ck[cu]  # dense custkey bitmap gather — one vectorized pass
        n = int(m.sum())
        return pa.table(
            {
                "key": t.column("o_orderkey").to_numpy(zero_copy_only=False)[m].astype(np.int64),
                "l_year": np.zeros(n, np.int64),
                "volume": np.zeros(n, np.float64),
                "vol_nat": np.zeros(n, np.float64),
                "side": np.ones(n, np.int8),
            },
            schema=tagged,
        )

    orders = C.read(sf_dir, "orders", ["o_orderkey", "o_custkey"]).map_batches(
        keep_orders, batch_format="pyarrow"
    )

    def partial_line(t: pa.Table) -> pa.Table:
        pb, sb = ray.get(pref), ray.get(sref2)
        pk = t.column("l_partkey").to_numpy(zero_copy_only=False)
        m = pb[pk]
        if not m.any():
            return tagged.empty_table()
        vol = (
            t.column("l_extendedprice").to_numpy(zero_copy_only=False)
            * (1.0 - t.column("l_discount").to_numpy(zero_copy_only=False))
        )[m]
        sk = t.column("l_suppkey").to_numpy(zero_copy_only=False)[m]
        is_nat = np.where(sk < len(sb), sb[np.minimum(sk, len(sb) - 1)], False)
        df = pd.DataFrame(
            {
                "key": t.column("l_orderkey").to_numpy(zero_copy_only=False)[m],
                "l_year": pc.year(t.column("l_shipdate")).to_numpy(zero_copy_only=False)[m],
                "volume": vol,
                "vol_nat": np.where(is_nat, vol, 0.0),
            }
        )
        out = df.groupby(["key", "l_year"], as_index=False).sum()
        return pa.table(
            {
                "key": out["key"].to_numpy(np.int64),
                "l_year": out["l_year"].to_numpy(np.int64),
                "volume": out["volume"].to_numpy(np.float64),
                "vol_nat": out["vol_nat"].to_numpy(np.float64),
                "side": np.zeros(len(out), np.int8),
            },
            schema=tagged,
        )

    line = C.read(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice",
         "l_discount", "l_shipdate"],
        filter=(
            (pads.field("l_shipdate") >= _dt.datetime(1996, 1, 1))
            & (pads.field("l_shipdate") < _dt.datetime(1998, 1, 1))
        ),
    ).map_batches(partial_line, batch_format="pyarrow")

    def semi(g: pd.DataFrame) -> pd.DataFrame:
        keep = g.loc[g["side"] == 1, "key"]
        e = g[(g["side"] == 0) & g["key"].isin(keep)]
        out = e.groupby("l_year", as_index=False)[["volume", "vol_nat"]].sum()
        return pd.DataFrame(
            {
                "l_year": out["l_year"].astype("int64"),
                "volume": out["volume"].astype("float64"),
                "vol_nat": out["vol_nat"].astype("float64"),
            }
        )

    parts = C.by_partition(line.union(orders), "key", semi).to_pandas()
    if len(parts) == 0:
        return pd.DataFrame(
            {
                "l_year": pd.Series([], dtype="int64"),
                "mkt_share": pd.Series([], dtype="float64"),
            }
        )
    out = parts.groupby("l_year", as_index=False)[["volume", "vol_nat"]].sum()
    out["mkt_share"] = (out["vol_nat"] / out["volume"]).round(C.ROUND_DIGITS)
    return out[["l_year", "mkt_share"]].sort_values("l_year").reset_index(drop=True)


Q8_SQL = f"""
SELECT l_year,
       round(sum(CASE WHEN s_nat = '{Q8_NATION}' THEN volume ELSE 0 END)
             / sum(volume), 4) AS mkt_share
FROM (
  SELECT CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume,
         n1.n_name AS s_nat
  FROM lineitem
  JOIN part     ON p_partkey = l_partkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  WHERE p_type = '{Q8_TYPE}'
    AND n2.n_regionkey = (
      SELECT n_regionkey FROM nation WHERE n_name = '{Q8_NATION}')
    AND l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1998-01-01'
)
GROUP BY l_year ORDER BY l_year
"""


# -- Q22: dormant high-balance customers --------------------------------------


# every testdata customer has at least one order, so bare NOT-EXISTS is
# degenerate; "dormant" = no order on/after this cutoff (last ~10 months
# of the order history at every tier), which keeps the anti-join populated
Q22_CUTOFF = "2000-10-01"


def q22_dormant_balances(sf_dir: str):
    """Customers above the global positive-average balance with NO recent
    orders, rolled up by market segment — the scalar-subquery + anti-join
    class (TPC-H Q22 adapted: mktsegment stands in for the phone country
    code the testdata lacks, and dormancy is "no order since Q22_CUTOFF").
    The threshold is two numbers per block (conditional sum/count partials
    folded on the driver — never a materialized pass); the anti-join is
    Ray's native hash-partitioned ``left_anti`` with the probe side
    already threshold-filtered map-side, so only above-average customers
    shuffle, and the orders side is date-pruned AT THE READ (row-group
    predicate pushdown) down to the recent window. The rollup output is
    segment-sized.

    Parity: the reference's existence-gated aggregate exports
    (indexer/aggr_jobs/order_jobs/*.sql NOT-EXISTS shapes)."""
    cust = C.read(
        sf_dir, "customer", ["c_custkey", "c_mktsegment", "c_acctbal"]
    )

    def bal_partial(t: pa.Table) -> pd.DataFrame:
        bal = t.column("c_acctbal").to_numpy(zero_copy_only=False)
        pos = bal[bal > 0.0]
        return pd.DataFrame({"s": [float(pos.sum())], "n": [int(len(pos))]})

    p = cust.map_batches(bal_partial, batch_format="pyarrow").to_pandas()
    avg_bal = float(p["s"].sum()) / max(int(p["n"].sum()), 1)

    rich = cust.filter(expr=f"c_acctbal > {avg_bal!r}")
    cutoff = _dt.datetime.fromisoformat(Q22_CUTOFF)
    recent = C.read(
        sf_dir, "orders", ["o_custkey"],
        filter=(pads.field("o_orderdate") >= cutoff),
    )
    dormant = rich.join(
        recent,
        join_type="left_anti",
        num_partitions=C.join_partitions(),
        on=("c_custkey",),
        right_on=("o_custkey",),
    )

    _EMPTY = pd.DataFrame(
        {"c_mktsegment": pd.Series(dtype=object),
         "numcust": pd.Series(dtype="int64"),
         "totacctbal": pd.Series(dtype="float64")}
    )

    def rollup(b: pd.DataFrame) -> pd.DataFrame:
        # Ray 2.49's hash join finalizes empty partitions schema-less
        if len(b) == 0 or "c_mktsegment" not in b.columns:
            return _EMPTY
        return b.groupby("c_mktsegment", as_index=False).agg(
            numcust=("c_custkey", "size"), totacctbal=("c_acctbal", "sum")
        )

    parts = dormant.map_batches(rollup, batch_format="pandas").to_pandas()
    if len(parts) == 0 or "c_mktsegment" not in parts.columns:
        return _EMPTY
    out = (
        parts.groupby("c_mktsegment", as_index=False)
        .agg(numcust=("numcust", "sum"), totacctbal=("totacctbal", "sum"))
        .sort_values("c_mktsegment", kind="stable")
        .reset_index(drop=True)
    )
    out["numcust"] = out["numcust"].astype("int64")
    return C.round_cols(out, ["totacctbal"])


Q22_SQL = f"""
SELECT c_mktsegment, count(*) AS numcust,
       round(sum(c_acctbal), 4) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '{Q22_CUTOFF}')
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


# -- Q16: supplier counts per part attribute group ----------------------------

Q16_EXCL_BRAND = "Brand#13"
Q16_SIZES = (3, 7, 14, 23, 36, 45)
Q16_EXCL_MOD = 7  # "suppliers with complaints" stand-in: s_suppkey % 7 == 0


def q16_supplier_part_counts(sf_dir: str):
    """COUNT(DISTINCT supplier) per (brand, type, size) over qualifying
    parts, excluding a blacklisted supplier set — TPC-H Q16 with the
    part-supplier pairs derived from lineitem (the testdata has no
    partsupp) and the complaints predicate standing on a key residue.
    Scale shape for exact grouped distinct-count: (1) part attrs ride as
    DENSE broadcast arrays (partkeys are dense ints) so each fact batch
    gathers brand/type/size vectorized and drops non-qualifying rows
    map-side; (2) per-batch ``drop_duplicates`` bounds egress at the
    distinct (group, suppkey) combos per block; (3) the shuffle
    co-locates ALL rows of a suppkey in one bounded partition, so each
    partition's distinct (group, suppkey) count is disjoint from every
    other's and the driver fold is an exact SUM over |groups|-sized
    partials — no global distinct materialization. At a part cardinality
    where the attr arrays outgrow a broadcast, the gather becomes the q7
    tagged co-shuffle on partkey; nothing downstream changes.

    Parity: the reference's distinct-entity rollups
    (indexer/aggr_jobs/disorder_jobs/daily_wallet_addresses_aggregates.sql)."""
    part = C.read_pandas(
        sf_dir, "part", ["p_partkey", "p_brand", "p_type", "p_size"]
    )
    sup = C.read_pandas(sf_dir, "supplier", ["s_suppkey"])
    excl = set(
        int(s) for s in sup["s_suppkey"] if int(s) % Q16_EXCL_MOD == 0
    )
    maxpk = int(part["p_partkey"].max())
    keep = np.zeros(maxpk + 1, dtype=bool)
    sel = (part["p_brand"] != Q16_EXCL_BRAND) & part["p_size"].isin(Q16_SIZES)
    keep[part.loc[sel, "p_partkey"].to_numpy()] = True
    brand = np.empty(maxpk + 1, dtype=object)
    ptype = np.empty(maxpk + 1, dtype=object)
    psize = np.zeros(maxpk + 1, dtype=np.int64)
    pk_all = part["p_partkey"].to_numpy()
    brand[pk_all] = part["p_brand"].to_numpy(dtype=object)
    ptype[pk_all] = part["p_type"].to_numpy(dtype=object)
    psize[pk_all] = part["p_size"].to_numpy()
    ref = C.broadcast((keep, brand, ptype, psize, np.array(sorted(excl))))

    def local_pairs(t: pa.Table) -> pd.DataFrame:
        kp, br, ty, sz, ex = ray.get(ref)
        pk = t.column("l_partkey").to_numpy(zero_copy_only=False)
        sk = t.column("l_suppkey").to_numpy(zero_copy_only=False)
        m = kp[pk] & ~np.isin(sk, ex)
        pk, sk = pk[m], sk[m]
        df = pd.DataFrame(
            {
                "p_brand": br[pk],
                "p_type": ty[pk],
                "p_size": sz[pk],
                "suppkey": sk.astype(np.int64),
            }
        )
        return df.drop_duplicates()

    pairs = C.read(
        sf_dir, "lineitem", ["l_partkey", "l_suppkey"]
    ).map_batches(local_pairs, batch_format="pyarrow")

    def part_distinct(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates()
        return d.groupby(
            ["p_brand", "p_type", "p_size"], as_index=False
        ).agg(supplier_cnt=("suppkey", "size"))

    hist = C.by_partition(pairs, "suppkey", part_distinct).to_pandas()
    if len(hist) == 0:
        return pd.DataFrame(
            {
                "p_brand": pd.Series(dtype=object),
                "p_type": pd.Series(dtype=object),
                "p_size": pd.Series(dtype="int64"),
                "supplier_cnt": pd.Series(dtype="int64"),
            }
        )
    out = hist.groupby(
        ["p_brand", "p_type", "p_size"], as_index=False
    )["supplier_cnt"].sum()
    out["p_size"] = out["p_size"].astype("int64")
    out["supplier_cnt"] = out["supplier_cnt"].astype("int64")
    return out.sort_values(
        ["supplier_cnt", "p_brand", "p_type", "p_size"],
        ascending=[False, True, True, True],
        kind="stable",
    ).reset_index(drop=True)


Q16_SQL = f"""
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand <> '{Q16_EXCL_BRAND}'
  AND p_size IN {Q16_SIZES}
  AND l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_suppkey % {Q16_EXCL_MOD} = 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# -- Q11: part value concentration ---------------------------------------------

Q11_FRACTION_BP = 1  # keep parts whose value > total / 10_000 (1 basis point)


def q11_value_concentration(sf_dir: str):
    """Parts whose lineitem revenue exceeds a fixed fraction of GLOBAL
    revenue — TPC-H Q11's "aggregate HAVING a global-scalar threshold"
    class (partsupp value → lineitem revenue on this schema). Exactness
    discipline: everything folds in INTEGER CENTS, and the threshold test
    is the cross-multiplied integer comparison ``part_cents × 10000 >
    total_cents`` — no float sum ordering can flip a boundary part on
    either side. Scale shape: per-batch (partkey, cents) partials are
    materialized once and feed BOTH the O(blocks) total fold and the
    bounded-partition per-part fold (partkey is near-unique — the Q13/Q18
    law); the broadcast threshold filters INSIDE each partition so only
    the O(1/fraction)-bounded winner set reaches the driver. Overflow
    bound: total cents < 2^63 up to ~9·10^16 dollars of revenue."""
    import ray as _ray

    line = C.read(sf_dir, "lineitem", ["l_partkey", "l_extendedprice"])

    def partial(t: pa.Table) -> pd.DataFrame:
        cents = np.floor(
            t.column("l_extendedprice").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        df = pd.DataFrame(
            {
                "p_partkey": t.column("l_partkey")
                .to_numpy(zero_copy_only=False)
                .astype(np.int64),
                "cents": cents,
            }
        )
        return df.groupby("p_partkey", as_index=False)["cents"].sum()

    partials = line.map_batches(partial, batch_format="pyarrow").materialize()

    def ptotal(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"t": [int(b["cents"].sum())]})

    total_cents = int(
        partials.map_batches(ptotal, batch_format="pandas").to_pandas()["t"].sum()
    )
    tref = C.broadcast(total_cents)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        tot = _ray.get(tref)
        s = g.groupby("p_partkey", as_index=False)["cents"].sum()
        s = s[s["cents"] * 10_000 * Q11_FRACTION_BP > tot]
        return s

    win = C.by_partition(partials, "p_partkey", fold).to_pandas()
    out = pd.DataFrame(
        {
            "p_partkey": win["p_partkey"].astype("int64"),
            "part_value": (win["cents"] / 100.0).round(C.ROUND_DIGITS),
        }
    )
    return out.sort_values(
        ["part_value", "p_partkey"], ascending=[False, True], kind="stable"
    ).reset_index(drop=True)


Q11_SQL = f"""
WITH c AS (
  SELECT l_partkey AS p_partkey,
         sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS cents
  FROM lineitem GROUP BY l_partkey
)
SELECT p_partkey, round(cents / 100.0, 4) AS part_value
FROM c
WHERE cents * {10_000 * Q11_FRACTION_BP} > (SELECT sum(cents) FROM c)
ORDER BY part_value DESC, p_partkey
"""


# -- RFM customer segmentation --------------------------------------------------


def customer_rfm_segments(sf_dir: str):
    """RFM segmentation: each customer scored on Recency (days since last
    order, vs the corpus max date), Frequency (order count) and Monetary
    (total spend, integer cents), each bucketed into terciles, rolled up
    to per-(r,f,m)-segment customer counts — the classic BI segmentation
    done with EXPLICIT tercile edges. NTILE would be wrong here: ties
    spanning a tercile boundary get arbitrary bucket assignments, so the
    contract is order-statistic edges at ranks ``floor((n−1)/3)`` and
    ``floor(2(n−1)/3)`` with the deterministic rule ``v ≤ edge`` — stable
    under ties on both engines. Scale shape: per-customer aggregates fold
    in bounded partitions (custkey near-unique, the Q13 law); each
    metric's two edges come from the sketch-guided global selection over
    the STILL-DISTRIBUTED aggregate (no sort, no driver materialization
    of customers); the segment rollup is a 27-cell bounded fold."""
    import ray as _ray

    from raycdc.queries.events import _kth_smallest

    orders = C.read(
        sf_dir, "orders", ["o_custkey", "o_orderdate", "o_totalprice"]
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "c": b["o_custkey"].astype("int64"),
                "last_us": b["o_orderdate"].astype("datetime64[us]")
                .to_numpy().view("int64"),
                "f": np.int64(1),
                "m": np.floor(
                    b["o_totalprice"].to_numpy() * 100.0
                ).astype(np.int64),
            }
        )
        return df.groupby("c", as_index=False).agg(
            last_us=("last_us", "max"), f=("f", "sum"), m=("m", "sum")
        )

    partials = orders.map_batches(partial, batch_format="pandas")

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("c", as_index=False).agg(
            last_us=("last_us", "max"), f=("f", "sum"), m=("m", "sum")
        )

    cust = C.by_partition(partials, "c", fold).materialize()

    def gmax(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"mx": [int(b["last_us"].max())]})

    max_us = int(
        cust.map_batches(gmax, batch_format="pandas").to_pandas()["mx"].max()
    )
    _US_DAY = 86_400_000_000

    def add_r(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["r"] = (max_us - b["last_us"].to_numpy(np.int64)) // _US_DAY
        return b

    scored = cust.map_batches(add_r, batch_format="pandas").materialize()
    n = scored.count()
    k1, k2 = int(np.floor((n - 1) / 3)), int(np.floor(2 * (n - 1) / 3))
    edges = {
        col: (_kth_smallest(scored, col, k1), _kth_smallest(scored, col, k2))
        for col in ("r", "f", "m")
    }
    eref = C.broadcast(edges)

    def seg(b: pd.DataFrame) -> pd.DataFrame:
        ed = _ray.get(eref)
        out = pd.DataFrame({"n_customers": np.ones(len(b), np.int64)})
        for col in ("r", "f", "m"):
            v = b[col].to_numpy(np.int64)
            e1, e2 = ed[col]
            out[f"{col}_seg"] = np.where(
                v <= e1, 0, np.where(v <= e2, 1, 2)
            ).astype(np.int64)
        return out.groupby(
            ["r_seg", "f_seg", "m_seg"], as_index=False
        )["n_customers"].sum()

    parts = scored.map_batches(seg, batch_format="pandas").to_pandas()
    out = parts.groupby(
        ["r_seg", "f_seg", "m_seg"], as_index=False
    )["n_customers"].sum()
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values(
        ["r_seg", "f_seg", "m_seg"], kind="stable"
    ).reset_index(drop=True)


RFM_SQL = """
WITH cust AS (
  SELECT o_custkey,
         CAST(((SELECT epoch_us(max(o_orderdate)) FROM orders)
               - epoch_us(max(o_orderdate))) // 86400000000 AS BIGINT) AS r,
         CAST(count(*) AS BIGINT) AS f,
         sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS m
  FROM orders GROUP BY o_custkey
), ranked AS (
  SELECT *, count(*) OVER () AS n FROM cust
), e AS (
  SELECT
    max(CASE WHEN rr = CAST(floor((n - 1) / 3) AS BIGINT) THEN r END) AS r1,
    max(CASE WHEN rr = CAST(floor(2 * (n - 1) / 3) AS BIGINT) THEN r END) AS r2,
    max(CASE WHEN fr = CAST(floor((n - 1) / 3) AS BIGINT) THEN f END) AS f1,
    max(CASE WHEN fr = CAST(floor(2 * (n - 1) / 3) AS BIGINT) THEN f END) AS f2,
    max(CASE WHEN mr = CAST(floor((n - 1) / 3) AS BIGINT) THEN m END) AS m1,
    max(CASE WHEN mr = CAST(floor(2 * (n - 1) / 3) AS BIGINT) THEN m END) AS m2
  FROM (SELECT n, r, f, m,
               row_number() OVER (ORDER BY r) - 1 AS rr,
               row_number() OVER (ORDER BY f) - 1 AS fr,
               row_number() OVER (ORDER BY m) - 1 AS mr
        FROM ranked)
)
SELECT CASE WHEN r <= e.r1 THEN 0 WHEN r <= e.r2 THEN 1 ELSE 2 END AS r_seg,
       CASE WHEN f <= e.f1 THEN 0 WHEN f <= e.f2 THEN 1 ELSE 2 END AS f_seg,
       CASE WHEN m <= e.m1 THEN 0 WHEN m <= e.m2 THEN 1 ELSE 2 END AS m_seg,
       CAST(count(*) AS BIGINT) AS n_customers
FROM cust, e
GROUP BY r_seg, f_seg, m_seg
ORDER BY r_seg, f_seg, m_seg
"""


# -- Q21: sole-failed-supplier wait counts -------------------------------------


def q21_sole_failed_supplier(sf_dir: str):
    """Per-supplier count of failed lines in multi-supplier finished
    orders where that supplier was the ONLY one with a failed line —
    TPC-H Q21's EXISTS + NOT-EXISTS pair adapted to the testdata
    (o_orderstatus='F' finished orders, l_returnflag='R' as the
    late/failed marker; no receipt/commit dates in the schema). Both
    correlated subqueries collapse into ONE co-shuffle: the F-order keys
    (pushdown-pruned at the read) and the lineitem rows ride a tagged
    union partitioned on orderkey, and a single vectorized kernel per
    bounded partition computes per-order distinct-supplier and
    distinct-failed-supplier counts, keeps orders with >1 suppliers and
    exactly 1 failing one, and emits per-supplier partial counts — the
    driver folds a supplier-sized frame. The supplier name map is a
    broadcast dim lookup.

    Parity: the reference's multi-entity consistency exports
    (indexer/jobs/export_transactions_and_logs_job.py cross-checks)."""
    tagged = pa.schema(
        [
            ("key", pa.int64()),
            ("suppkey", pa.int64()),
            ("failed", pa.int8()),
            ("side", pa.int8()),
        ]
    )

    def order_side(t: pa.Table) -> pa.Table:
        ok = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        n = len(ok)
        return pa.table(
            {
                "key": ok.astype(np.int64),
                "suppkey": np.zeros(n, np.int64),
                "failed": np.zeros(n, np.int8),
                "side": np.ones(n, np.int8),
            },
            schema=tagged,
        )

    orders = C.read(
        sf_dir, "orders", ["o_orderkey"],
        filter=(pads.field("o_orderstatus") == "F"),
    ).map_batches(order_side, batch_format="pyarrow")

    def line_side(t: pa.Table) -> pa.Table:
        ok = t.column("l_orderkey").to_numpy(zero_copy_only=False)
        sk = t.column("l_suppkey").to_numpy(zero_copy_only=False)
        fl = (
            pc.equal(t.column("l_returnflag"), "R")
            .to_numpy(zero_copy_only=False)
            .astype(np.int8)
        )
        return pa.table(
            {
                "key": ok.astype(np.int64),
                "suppkey": sk.astype(np.int64),
                "failed": fl,
                "side": np.zeros(len(ok), np.int8),
            },
            schema=tagged,
        )

    line = C.read(
        sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_returnflag"]
    ).map_batches(line_side, batch_format="pyarrow")

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        fkeys = g.loc[g["side"] == 1, "key"].unique()
        l = g[(g["side"] == 0) & g["key"].isin(fkeys)]
        lf = l[l["failed"] == 1]
        if len(lf) == 0:
            return pd.DataFrame(
                {"suppkey": pd.Series(dtype="int64"),
                 "numwait": pd.Series(dtype="int64")}
            )
        nsupp = l.groupby("key")["suppkey"].nunique()
        nfail = lf.groupby("key")["suppkey"].nunique()
        qual = nfail.index[(nfail == 1) & (nsupp.reindex(nfail.index) > 1)]
        lq = lf[lf["key"].isin(qual)]
        return lq.groupby("suppkey", as_index=False).agg(
            numwait=("suppkey", "size")
        )

    parts = C.by_partition(line.union(orders), "key", kernel).to_pandas()
    if len(parts) == 0:
        return pd.DataFrame(
            {"s_name": pd.Series(dtype=object),
             "numwait": pd.Series(dtype="int64")}
        )
    sup = C.read_pandas(sf_dir, "supplier", ["s_suppkey", "s_name"])
    names = dict(zip(sup["s_suppkey"].astype(int), sup["s_name"]))
    out = parts.groupby("suppkey", as_index=False)["numwait"].sum()
    out["s_name"] = out["suppkey"].map(names)
    out = out[["s_name", "numwait"]]
    out["numwait"] = out["numwait"].astype("int64")
    return out.sort_values(
        ["numwait", "s_name"], ascending=[False, True], kind="stable"
    ).reset_index(drop=True)


Q21_SQL = """
SELECT s_name, count(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_name
ORDER BY numwait DESC, s_name
"""


QUERIES = {
    "q7_volume_shipping": q7_volume_shipping,
    "q8_market_share": q8_market_share,
    "q13_customer_distribution": q13_customer_distribution,
    "q14_promo_revenue": q14_promo_revenue,
    "q15_top_supplier": q15_top_supplier,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "q18_large_volume_customers": q18_large_volume_customers,
    "q19_banded_revenue": q19_banded_revenue,
    "q22_dormant_balances": q22_dormant_balances,
    "q16_supplier_part_counts": q16_supplier_part_counts,
    "q21_sole_failed_supplier": q21_sole_failed_supplier,
    "q11_value_concentration": q11_value_concentration,
    "customer_rfm_segments": customer_rfm_segments,
}

ORACLE_SQL = {
    "q7_volume_shipping": Q7_SQL,
    "q8_market_share": Q8_SQL,
    "q13_customer_distribution": Q13_SQL,
    "q14_promo_revenue": Q14_SQL,
    "q15_top_supplier": Q15_SQL,
    "q17_small_quantity_revenue": Q17_SQL,
    "q18_large_volume_customers": Q18_SQL,
    "q19_banded_revenue": _q19_sql(),
    "q22_dormant_balances": Q22_SQL,
    "q16_supplier_part_counts": Q16_SQL,
    "q21_sole_failed_supplier": Q21_SQL,
    "q11_value_concentration": Q11_SQL,
    "customer_rfm_segments": RFM_SQL,
}
