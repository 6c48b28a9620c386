"""Derived-aggregate parity: the reference's two-phase aggr_jobs —
day-parallel partials then strictly-ordered cumulative folding
(``indexer/aggr_jobs/disorder_jobs/disorder_job.py:16-33``,
``order_jobs/order_job.py:13-24``, the SQL under ``indexer/aggr_jobs/*/*.sql``
in /root/reference) — plus explode-to-entity-views
(``indexer/modules/custom/address_index/address_index_job.py:122-307``) and
exact COUNT(DISTINCT) (the reference uses exact distincts, no sketches).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Count, Max, Sum

from raycdc.queries import common as C


# -- explode to per-entity views (address-index analog, SQL-checkable) -----

def lineitem_entity_views(sf_dir: str):
    """Each lineitem row explodes into two entity views (supplier side and
    part side) — the 1-row→N-views pattern of the reference's address
    index — then per-entity revenue aggregates."""
    ds = C.read(sf_dir, "lineitem", ["l_suppkey", "l_partkey", "l_extendedprice", "l_discount"])

    def explode(t: pa.Table) -> pa.Table:
        rev = pc.multiply(
            t.column("l_extendedprice"), pc.subtract(pa.scalar(1.0), t.column("l_discount"))
        )
        n = t.num_rows
        return pa.table(
            {
                "entity_type": pa.array(
                    ["supplier"] * n + ["part"] * n, pa.string()
                ),
                "entity_id": pa.concat_arrays(
                    [
                        pc.cast(t.column("l_suppkey"), pa.int64()).combine_chunks(),
                        pc.cast(t.column("l_partkey"), pa.int64()).combine_chunks(),
                    ]
                ),
                "revenue": pa.concat_arrays(
                    [rev.combine_chunks(), rev.combine_chunks()]
                ),
            }
        )

    out = (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby(["entity_type", "entity_id"])
        .aggregate(Count(alias_name="n_items"), Sum("revenue", alias_name="revenue"))
        .to_pandas()
    )
    return C.round_cols(out, ["revenue"])


ENTITY_VIEWS_SQL = """
SELECT entity_type, entity_id, count(*) AS n_items, round(sum(revenue), 4) AS revenue
FROM (
    SELECT 'supplier' AS entity_type, l_suppkey AS entity_id,
           l_extendedprice * (1 - l_discount) AS revenue FROM lineitem
    UNION ALL
    SELECT 'part', l_partkey, l_extendedprice * (1 - l_discount) FROM lineitem
)
GROUP BY entity_type, entity_id
"""


# -- exact COUNT(DISTINCT) (per-group sets merged in a second stage) -------

def priority_distinct_customers(sf_dir: str):
    """COUNT(DISTINCT o_custkey) per priority: per-batch distinct pairs
    (combiner) → exact distinct count per group."""
    ds = C.read(sf_dir, "orders", ["o_orderpriority", "o_custkey"])

    def local_distinct(b: pd.DataFrame) -> pd.DataFrame:
        return b.drop_duplicates()

    def count_distinct(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "o_orderpriority": [g["o_orderpriority"].iloc[0]],
                "n_customers": [int(g["o_custkey"].nunique())],
            }
        )

    return (
        ds.map_batches(local_distinct, batch_format="pandas")
        .groupby("o_orderpriority")
        .map_groups(count_distinct, batch_format="pandas")
    )


PRIORITY_DISTINCT_SQL = """
SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_customers
FROM orders GROUP BY o_orderpriority
"""


# -- two-phase daily -> cumulative over the replayed CDC lake --------------

def conv_daily_stats(sf_dir: str):
    """Phase 1 (day-parallel partials): per (conv_id, day) turn counts and
    role mix over the replayed transcript lake."""
    from raycdc.queries.cdc import _replay

    lake = _replay(sf_dir, salted=False)
    lake["day"] = lake["ts"].dt.floor("D")
    agg = lake.groupby(["conv_id", "day"], as_index=False).agg(
        n_turns=("turn_idx", "size"),
        n_assistant=("role", lambda r: int((r == "assistant").sum())),
        last_ts=("ts", "max"),
    )
    return agg.sort_values(["conv_id", "day"]).reset_index(drop=True)


def conv_cumulative_stats(sf_dir: str):
    """Phase 2 (strictly ordered): fold daily partials into per-conv
    running cumulative counts, day by day — the reference's order_job
    semantics (each day folds into the previous cumulative row)."""
    daily = conv_daily_stats(sf_dir)
    daily = daily.sort_values(["conv_id", "day"], kind="stable")
    daily["cum_turns"] = daily.groupby("conv_id")["n_turns"].cumsum()
    daily["cum_assistant"] = daily.groupby("conv_id")["n_assistant"].cumsum()
    return daily.reset_index(drop=True)


QUERIES = {
    "lineitem_entity_views": lineitem_entity_views,
    "priority_distinct_customers": priority_distinct_customers,
    "conv_daily_stats": conv_daily_stats,
    "conv_cumulative_stats": conv_cumulative_stats,
}

ORACLE_SQL = {
    "lineitem_entity_views": ENTITY_VIEWS_SQL,
    "priority_distinct_customers": PRIORITY_DISTINCT_SQL,
}
