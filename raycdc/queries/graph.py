"""Graph operators over the purchase-interaction graph: nodes are
customers and suppliers, edges are DISTINCT (customer, supplier)
relationships from ``orders ⋈ lineitem``, kept in BOTH directions so the
graph is symmetric (every node has out-degree ≥ 1 — no dangling-mass
special case).

``graph_pagerank`` is fixed-iteration PageRank in EXACT integer
fixed-point arithmetic: ranks are int64 multiples of 1/PR_SCALE, the
damping step is ``BASE + (85·Σ) // 100`` with floor division, so the Ray
result and the DuckDB oracle agree bit-for-bit — no float
summation-order risk anywhere (the same exactness discipline as
``events_value_outliers``). The distributed shape is the real one:
edges are hash-partitioned ONCE and materialized; each iteration
co-shuffles only node-sized rank state to the edge partitions
(the tagged-schema ``C.by_partition`` co-shuffle — ``Dataset.join`` on
iterative node-sized sides loses schemas on empty hash partitions, the
r03 ``neardup_clusters`` failure), messages pre-aggregate per partition
before the global per-node sum. Driver-side state: none — adjacency,
degrees and ranks are all Datasets.

Overflow bound: Σ contrib ≤ max_in_degree · PR_SCALE; with PR_SCALE=1e9
the int64 damping product 85·Σ is exact for in-degrees up to ~1e8 —
beyond any real node at 100 TB once hot keys are salted.

Reference analog: the reference maintains derived per-address aggregate
tables over the transfer graph (``indexer/modules/custom/*`` holder /
balance jobs in /root/reference); this is the iterative-algorithm
generalization of that derived-table pattern, Ray-Data-first.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from raycdc.queries import common as C

SUPP_OFF = 10_000_000  # supplier node id = l_suppkey + SUPP_OFF
PR_SCALE = 1_000_000_000  # rank unit = 1e-9
PR_BASE = 15 * PR_SCALE // 100  # (1 - d) · SCALE, d = 0.85
PR_ITERS = 3

# ONE tagged schema for the co-shuffled union (edges + node state); empty
# blocks keep this schema through every shuffle.
_TAG = pa.schema(
    [
        ("key", pa.int64()),
        ("a", pa.int64()),
        ("b", pa.int64()),
        ("side", pa.int8()),
    ]
)


def _tagged(key: np.ndarray, a: np.ndarray, b: np.ndarray, side: int) -> pa.Table:
    n = len(key)
    return pa.Table.from_arrays(
        [
            pa.array(key.astype(np.int64), pa.int64()),
            pa.array(a.astype(np.int64), pa.int64()),
            pa.array(b.astype(np.int64), pa.int64()),
            pa.array(np.full(n, side, np.int8)),
        ],
        schema=_TAG,
    )


def _edge_dataset(sf_dir: str):
    """Symmetric distinct edge list as a tagged Dataset (key=src, a=dst).

    Per-batch local distinct BEFORE the big-big join cuts shuffle volume
    (lineitem repeats (orderkey, suppkey) across lines); the global
    distinct runs per bounded partition keyed by customer — all rows of a
    (c, s) pair co-locate, so partition-local ``drop_duplicates`` is
    globally exact."""
    orders = C.read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    line = C.read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey"])

    def loc_dist(b: pd.DataFrame) -> pd.DataFrame:
        return b.drop_duplicates(["l_orderkey", "l_suppkey"])

    j = line.map_batches(loc_dist, batch_format="pandas").join(
        orders,
        join_type="inner",
        num_partitions=C.join_partitions(),
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def pair_dist(g: pd.DataFrame) -> pd.DataFrame:
        return g[["o_custkey", "l_suppkey"]].drop_duplicates()

    pairs = C.by_partition(
        j.select_columns(["o_custkey", "l_suppkey"]), "o_custkey", pair_dist
    )

    def tag_edges(b: pd.DataFrame) -> pa.Table:
        c = b["o_custkey"].to_numpy().astype(np.int64)
        s = b["l_suppkey"].to_numpy().astype(np.int64) + SUPP_OFF
        key = np.concatenate([c, s])
        dst = np.concatenate([s, c])
        return _tagged(key, dst, np.zeros(len(key), np.int64), 0)

    return pairs.map_batches(tag_edges, batch_format="pandas")


def graph_pagerank(sf_dir: str):
    """PR_ITERS rounds of integer PageRank; output (node, pr) where pr is
    the rank in units of 1/PR_SCALE. See module docstring for the law.

    Stage economy: degrees are NOT a separate dataset/join — the
    propagate partition is keyed by src, so ALL out-edges of a node
    co-locate and the degree is an in-kernel ``transform('size')``; and
    round 1 ships no rank state at all (r0 is the constant PR_SCALE).
    Each iteration is therefore ONE co-shuffle + one node-sized groupby,
    with per-partition partial sums as the combiner."""
    nparts = C.join_partitions()
    edges = _edge_dataset(sf_dir).materialize()

    _MSG = pa.schema([("node", pa.int64()), ("c", pa.int64())])

    def make_step(first: bool):
        def step(g: pd.DataFrame) -> pd.DataFrame:
            e = g[g["side"] == 0].copy()
            e["d"] = e.groupby("key")["key"].transform("size")
            if first:
                e["r"] = np.int64(PR_SCALE)
            else:
                lab = g.loc[g["side"] == 1, ["key", "a"]].rename(
                    columns={"a": "r"}
                )
                e = e.merge(lab, on="key", how="inner")
            out = pd.DataFrame(
                {
                    "node": e["a"].to_numpy().astype(np.int64),
                    "c": e["r"].to_numpy() // e["d"].to_numpy(),
                }
            )
            return out.groupby("node", as_index=False)["c"].sum()

        return step

    def conform_msgs(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [t.column("node").cast(pa.int64()), t.column("c").cast(pa.int64())],
            schema=_MSG,
        )

    def damp(t: pa.Table) -> pa.Table:
        n = t.column("node").to_numpy(zero_copy_only=False).astype(np.int64)
        s = t.column("sum(c)").to_numpy(zero_copy_only=False).astype(np.int64)
        r = PR_BASE + (85 * s) // 100
        return _tagged(n, r, np.zeros(len(n), np.int64), 1)

    ranks = None
    for i in range(PR_ITERS):
        src = edges if i == 0 else edges.union(ranks)
        msgs = C.by_partition(
            src, "key", make_step(i == 0), nparts=nparts
        ).map_batches(conform_msgs, batch_format="pyarrow")
        ranks = (
            msgs.groupby("node")
            .sum("c")
            .map_batches(damp, batch_format="pyarrow")
            .repartition(nparts)
            .materialize()
        )

    def out_rows(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [t.column("key").cast(pa.int64()), t.column("a").cast(pa.int64())],
            schema=pa.schema([("node", pa.int64()), ("pr", pa.int64())]),
        )

    return ranks.map_batches(out_rows, batch_format="pyarrow")


def _pagerank_sql() -> str:
    head = f"""
WITH pair AS (
  SELECT DISTINCT o_custkey AS c, l_suppkey AS s
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
), edges AS (
  SELECT c AS src, s + {SUPP_OFF} AS dst FROM pair
  UNION ALL
  SELECT s + {SUPP_OFF} AS src, c AS dst FROM pair
), deg AS (
  SELECT src, CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY src
), r0 AS (
  SELECT src AS node, CAST({PR_SCALE} AS BIGINT) AS r FROM deg
)"""
    steps = []
    for i in range(1, PR_ITERS + 1):
        steps.append(
            f""", c{i} AS (
  SELECT e.dst AS node, sum(r.r // g.d) AS s
  FROM edges e JOIN r{i - 1} r ON e.src = r.node JOIN deg g ON e.src = g.src
  GROUP BY e.dst
), r{i} AS (
  SELECT node, CAST({PR_BASE} + (85 * s) // 100 AS BIGINT) AS r FROM c{i}
)"""
        )
    return head + "".join(steps) + f"\nSELECT node, r AS pr FROM r{PR_ITERS}"


QUERIES = {
    "graph_pagerank": graph_pagerank,
}

ORACLE_SQL = {
    "graph_pagerank": _pagerank_sql(),
}
