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
    (combiner) → native distributed aggregate to globally-unique pairs →
    native count per priority. Two hash aggregates, zero per-group
    Python."""
    ds = C.read(sf_dir, "orders", ["o_orderpriority", "o_custkey"])

    def local_distinct(b: pd.DataFrame) -> pd.DataFrame:
        return b.drop_duplicates()

    uniq = (
        ds.map_batches(local_distinct, batch_format="pandas")
        .groupby(["o_orderpriority", "o_custkey"])
        .aggregate(Count(alias_name="_n"))
    )
    out = uniq.groupby("o_orderpriority").aggregate(Count(alias_name="n_customers"))

    def pin(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "o_orderpriority": b["o_orderpriority"],
                "n_customers": b["n_customers"].astype("int64"),
            }
        )

    return out.map_batches(pin, batch_format="pandas")


PRIORITY_DISTINCT_SQL = """
SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_customers
FROM orders GROUP BY o_orderpriority
"""


# -- two-phase daily -> cumulative over the replayed CDC lake --------------

def _conv_daily_ds(sf_dir: str):
    from raycdc.queries.cdc import _replayed_engine

    return conv_daily_from_engine(_replayed_engine(sf_dir, salted=False))


def conv_daily_from_engine(eng):
    """Phase 1 as a streaming Dataset: per (conv_id, day) turn counts and
    role mix over a transcript lake — distributed groupby over
    ``Engine.read_lake()``, never driver pandas (the reference's
    day-parallel disorder_job, ``indexer/aggr_jobs/disorder_jobs/
    disorder_job.py:16-33``). Takes any Engine (the CLI materializes this
    over an existing lake — aggr_job_scheduler analog)."""
    ds = eng.read_lake(columns=["conv_id", "role", "ts"])

    def to_day(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "conv_id": t.column("conv_id"),
                "day": pc.floor_temporal(t.column("ts"), unit="day"),
                # role can be null (upsert-created keys whose updates never
                # patched it) — null == 'assistant' is null, which Sum would
                # drop; coalesce to false so it counts as 0 like the oracle
                "is_assistant": pc.cast(
                    pc.fill_null(pc.equal(t.column("role"), "assistant"), False),
                    pa.int64(),
                ),
                "ts": t.column("ts"),
            }
        )

    agg = (
        ds.map_batches(to_day, batch_format="pyarrow")
        .groupby(["conv_id", "day"])
        .aggregate(
            Count(alias_name="n_turns"),
            Sum("is_assistant", alias_name="n_assistant"),
            Max("ts", alias_name="last_ts"),
        )
    )

    def pin_types(t: pa.Table) -> pa.Table:
        # Sum() widens to float64 and day can come back second-resolution;
        # pin both so the DuckDB oracle's BIGINT/timestamp compare exactly
        for c, typ in (
            ("n_turns", pa.int64()),
            ("n_assistant", pa.int64()),
            ("day", pa.timestamp("us")),
        ):
            i = t.schema.get_field_index(c)
            t = t.set_column(i, c, t.column(c).cast(typ))
        return t

    return agg.map_batches(pin_types, batch_format="pyarrow")


def conv_daily_stats(sf_dir: str):
    return _conv_daily_ds(sf_dir)


def conv_cumulative_from_daily(daily):
    """Phase 2 (strictly ordered): fold daily partials into per-conv
    running cumulative counts, day by day (the reference's order_job
    semantics: each day folds into the previous cumulative row,
    ``indexer/aggr_jobs/order_jobs/order_job.py:13-24``). Conversations
    are co-located on bounded hash partitions; the fold is one sort +
    Cython ``groupby().cumsum()`` per partition — no per-conversation
    Python on the near-unique conv_id key."""

    def cum(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["conv_id", "day"], kind="stable")
        cums = g.groupby("conv_id")[["n_turns", "n_assistant"]].cumsum()
        g["cum_turns"] = cums["n_turns"]
        g["cum_assistant"] = cums["n_assistant"]
        return g

    return C.by_partition(daily, "conv_id", cum)


def conv_cumulative_stats(sf_dir: str):
    return conv_cumulative_from_daily(_conv_daily_ds(sf_dir))


CONV_DAILY_SQL_TEMPLATE = """
WITH replay AS ({replay})
SELECT conv_id, date_trunc('day', ts) AS day,
       count(*) AS n_turns,
       CAST(count(*) FILTER (WHERE role = 'assistant') AS BIGINT) AS n_assistant,
       max(ts) AS last_ts
FROM replay GROUP BY conv_id, date_trunc('day', ts)
"""

CONV_CUMULATIVE_SQL_TEMPLATE = """
WITH daily AS ({daily})
SELECT *,
       CAST(sum(n_turns) OVER w AS BIGINT) AS cum_turns,
       CAST(sum(n_assistant) OVER w AS BIGINT) AS cum_assistant
FROM daily
WINDOW w AS (PARTITION BY conv_id ORDER BY day ROWS UNBOUNDED PRECEDING)
"""


def build_aggregate_oracle_sql(sf_dir: str) -> dict[str, str]:
    """DuckDB oracles for the lake-derived aggregates (built on the replay
    oracle SQL of raycdc.queries.cdc, same generated log path)."""
    from raycdc.queries.cdc import build_cdc_oracle_sql

    replay = build_cdc_oracle_sql(sf_dir)["cdc_replay"]
    daily = CONV_DAILY_SQL_TEMPLATE.format(replay=replay)
    return {
        "conv_daily_stats": daily,
        "conv_cumulative_stats": CONV_CUMULATIVE_SQL_TEMPLATE.format(daily=daily),
    }


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
