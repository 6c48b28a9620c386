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
        # no repartition: ranks are node-sized and the aggregate emits
        # O(hash partitions) blocks — the next union/shuffle re-buckets
        # anyway, and each saved barrier is wall-time at driver parity
        ranks = (
            msgs.groupby("node")
            .sum("c")
            .map_batches(damp, batch_format="pyarrow")
            .materialize()
        )

    def out_rows(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [t.column("key").cast(pa.int64()), t.column("a").cast(pa.int64())],
            schema=pa.schema([("node", pa.int64()), ("pr", pa.int64())]),
        )

    return ranks.map_batches(out_rows, batch_format="pyarrow")


# -- BFS hop distance (frontier iteration with per-level distinct) ----------

BFS_SRC = 1          # source node: customer 1 (present at every tier)
BFS_MAX_HOPS = 4


def graph_bfs_hops(sf_dir: str):
    """Hop distance from one source over the symmetric purchase graph —
    the traversal class (PageRank is fixed-point numeric, components is
    label convergence; BFS is LEVEL-SET expansion). The distributed shape
    is frontier iteration: edges hash-partition ONCE; each level
    co-shuffles only the frontier (node-sized) to the edge partitions,
    expands to neighbor sets with a partition-local distinct, then
    dedupes globally inside bounded partitions so the frontier never
    exceeds the node count (no path multiplicity — the explosion a naive
    recursive expansion suffers). ``hops = min level`` folds at the end,
    so re-visits at later levels are harmless. The oracle unrolls the
    same level sets as DISTINCT-joined CTEs. All-integer output."""
    import ray

    nparts = C.join_partitions()
    edges = _edge_dataset(sf_dir).materialize()

    def to_tagged(b: pd.DataFrame) -> pa.Table:
        n = b["node"].to_numpy().astype(np.int64)
        z = np.zeros(len(n), np.int64)
        return _tagged(n, z, z, 1)

    _NODE = pa.schema([("node", pa.int64())])
    frontier = ray.data.from_arrow(
        pa.table({"node": pa.array([BFS_SRC], pa.int64())}, schema=_NODE)
    )
    levels = [frontier.map_batches(
        lambda b, _l=0: b.assign(hops=np.int64(_l)), batch_format="pandas"
    )]

    def expand(g: pd.DataFrame) -> pd.DataFrame:
        f = g.loc[g["side"] == 1, "key"]
        if not len(f):
            return pd.DataFrame({"node": pd.Series(dtype="int64")})
        e = g[g["side"] == 0]
        hit = e[e["key"].isin(set(f))]
        return pd.DataFrame(
            {"node": pd.unique(hit["a"].to_numpy().astype(np.int64))}
        )

    def dedup(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates("node")

    for lvl in range(1, BFS_MAX_HOPS + 1):
        tagged = frontier.map_batches(to_tagged, batch_format="pandas")
        nxt = C.by_partition(edges.union(tagged), "key", expand, nparts=nparts)
        frontier = C.by_partition(nxt, "node", dedup, nparts=nparts).materialize()
        levels.append(frontier.map_batches(
            lambda b, _l=lvl: b.assign(hops=np.int64(_l)), batch_format="pandas"
        ))

    allv = levels[0].union(*levels[1:])

    def min_fold(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby("node", as_index=False)["hops"].min()
        m["node"] = m["node"].astype("int64")
        m["hops"] = m["hops"].astype("int64")
        return m

    out = C.by_partition(allv, "node", min_fold).to_pandas()
    return out.sort_values(["hops", "node"], kind="stable").reset_index(
        drop=True
    )


def _bfs_sql() -> str:
    head = f"""
WITH pair AS (
  SELECT DISTINCT o_custkey AS c, l_suppkey AS s
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
), edges AS (
  SELECT c AS src, s + {SUPP_OFF} AS dst FROM pair
  UNION ALL
  SELECT s + {SUPP_OFF} AS src, c AS dst FROM pair
), h0 AS (SELECT CAST({BFS_SRC} AS BIGINT) AS node)"""
    steps = "".join(
        f""", h{i} AS (
  SELECT DISTINCT e.dst AS node FROM edges e JOIN h{i - 1} f ON e.src = f.node
)"""
        for i in range(1, BFS_MAX_HOPS + 1)
    )
    lvl = ", lvl AS (" + " UNION ALL ".join(
        f"SELECT node, {i} AS hops FROM h{i}"
        for i in range(BFS_MAX_HOPS + 1)
    ) + ")"
    return (
        head + steps + lvl
        + "\nSELECT node, CAST(min(hops) AS BIGINT) AS hops FROM lvl "
          "GROUP BY node ORDER BY hops, node"
    )


# -- label propagation (community detection) ---------------------------------

LPA_ITERS = 2


def graph_label_prop(sf_dir: str):
    """Synchronous LABEL-PROPAGATION community detection over the purchase
    graph — the third iterative-graph class next to PageRank (numeric
    fixed point) and BFS (level sets): here the per-node fold is a grouped
    MODE. Law (deterministic, shared with the oracle): label₀(v) = v;
    labelₜ(v) = the most frequent label among v's neighbors at t−1, ties
    broken by the SMALLEST label; LPA_ITERS synchronous rounds.

    Distributed shape = the PageRank loop: edges hash-partition ONCE;
    each round co-shuffles only node-sized label state to the edge
    partitions (tagged union — never ``Dataset.join`` on iterative
    sides), messages PRE-COUNT per (node, label) inside the partition
    (the combiner), and the global mode folds inside bounded partitions
    keyed by node. All-integer, hash-exact."""
    nparts = C.join_partitions()
    edges = _edge_dataset(sf_dir).materialize()

    _MSG = pa.schema(
        [("node", pa.int64()), ("label", pa.int64()), ("c", pa.int64())]
    )

    def make_step(first: bool):
        def step(g: pd.DataFrame) -> pd.DataFrame:
            e = g[g["side"] == 0]
            if first:
                out = pd.DataFrame(
                    {
                        "node": e["a"].to_numpy().astype(np.int64),
                        "label": e["key"].to_numpy().astype(np.int64),
                    }
                )
            else:
                lab = g.loc[g["side"] == 1, ["key", "a"]].rename(
                    columns={"a": "label"}
                )
                m = e.merge(lab, on="key", how="inner")
                out = pd.DataFrame(
                    {
                        "node": m["a"].to_numpy().astype(np.int64),
                        "label": m["label"].to_numpy().astype(np.int64),
                    }
                )
            cnt = (
                out.groupby(["node", "label"], as_index=False)
                .size()
                .rename(columns={"size": "c"})
            )
            cnt["c"] = cnt["c"].astype("int64")
            return cnt

        return step

    def conform_msgs(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [
                t.column("node").cast(pa.int64()),
                t.column("label").cast(pa.int64()),
                t.column("c").cast(pa.int64()),
            ],
            schema=_MSG,
        )

    def mode_fold(g: pd.DataFrame) -> pd.DataFrame:
        cnt = g.groupby(["node", "label"], as_index=False)["c"].sum()
        cnt = cnt.sort_values(
            ["node", "c", "label"], ascending=[True, False, True], kind="stable"
        )
        win = cnt.drop_duplicates("node")
        return pd.DataFrame(
            {
                "node": win["node"].astype("int64"),
                "label": win["label"].astype("int64"),
            }
        )

    def to_state(b: pd.DataFrame) -> pa.Table:
        return _tagged(
            b["node"].to_numpy().astype(np.int64),
            b["label"].to_numpy().astype(np.int64),
            np.zeros(len(b), np.int64),
            1,
        )

    labels = None
    for i in range(LPA_ITERS):
        src = edges if i == 0 else edges.union(labels)
        msgs = C.by_partition(
            src, "key", make_step(i == 0), nparts=nparts
        ).map_batches(conform_msgs, batch_format="pyarrow")
        folded = C.by_partition(msgs, "node", mode_fold, nparts=nparts)
        labels = folded.map_batches(
            to_state, batch_format="pandas"
        ).materialize()

    def out_rows(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [t.column("key").cast(pa.int64()), t.column("a").cast(pa.int64())],
            schema=pa.schema([("node", pa.int64()), ("label", pa.int64())]),
        )

    return labels.map_batches(out_rows, batch_format="pyarrow")


def _lpa_sql() -> str:
    head = f"""
WITH pair AS (
  SELECT DISTINCT o_custkey AS c, l_suppkey AS s
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
), edges AS (
  SELECT c AS src, s + {SUPP_OFF} AS dst FROM pair
  UNION ALL
  SELECT s + {SUPP_OFF} AS src, c AS dst FROM pair
), l0 AS (SELECT DISTINCT src AS node, src AS label FROM edges)"""
    steps = "".join(
        f""", m{i} AS (
  SELECT e.dst AS node, l.label, count(*) AS c
  FROM edges e JOIN l{i - 1} l ON l.node = e.src GROUP BY 1, 2
), l{i} AS (
  SELECT node, label FROM (
    SELECT node, label, row_number() OVER (
      PARTITION BY node ORDER BY c DESC, label) AS rn FROM m{i})
  WHERE rn = 1
)"""
        for i in range(1, LPA_ITERS + 1)
    )
    return (
        head + steps
        + f"\nSELECT CAST(node AS BIGINT) AS node,"
          f" CAST(label AS BIGINT) AS label FROM l{LPA_ITERS} ORDER BY node"
    )


WEDGE_DEG_CAP = 64  # parts hotter than this are excluded BY RULE (both sides)
PAIR_MOD = SUPP_OFF  # packed pair key: s1 * PAIR_MOD + s2 (suppkey < 1e7)


def _wedge_kernel(g: pd.DataFrame) -> pd.DataFrame:
    """PARTIAL co-supply pair counts for one part-keyed partition
    (columns l_partkey, l_suppkey; all rows of a part co-locate). Wedge
    enumeration is vectorized by degree bucket: groups of equal size d
    reshape to a (g, d) matrix and expand through one ``np.triu_indices``
    — a loop over ≤ WEDGE_DEG_CAP distinct sizes, never over parts or
    rows. Property-tested against a brute-force pair count
    (tests/test_graph.py)."""
    empty = pd.DataFrame(
        {"pairkey": pd.Series(dtype="int64"), "n": pd.Series(dtype="int64")}
    )
    d = g.drop_duplicates(["l_partkey", "l_suppkey"]).sort_values(
        ["l_partkey", "l_suppkey"]
    )
    if not len(d):
        return empty
    p = d["l_partkey"].to_numpy()
    s = d["l_suppkey"].to_numpy().astype(np.int64)
    new = np.ones(len(d), bool)
    new[1:] = p[1:] != p[:-1]
    gid = np.cumsum(new) - 1
    sizes = np.bincount(gid)
    ok = (sizes >= 2) & (sizes <= WEDGE_DEG_CAP)
    keep = ok[gid]
    s = s[keep]
    sz = sizes[gid[keep]]
    frames = []
    for d0 in np.unique(sz):
        m = sz == d0
        mat = s[m].reshape(-1, d0)  # suppliers ascend within each part
        iu, ju = np.triu_indices(d0, k=1)
        frames.append(
            pd.DataFrame(
                {"pairkey": mat[:, iu].ravel() * PAIR_MOD + mat[:, ju].ravel()}
            )
        )
    if not frames:
        return empty
    out = pd.concat(frames, ignore_index=True)
    out = (
        out.groupby("pairkey", as_index=False)
        .size()
        .rename(columns={"size": "n"})
    )
    out["n"] = out["n"].astype("int64")
    return out


# process-level memo: the co-supply edge set feeds graph_triangles too —
# one build per (process, sf_dir), the result is edge-set-sized
_COSUPPLY_MEMO: dict = {}


def graph_cosupply_pairs(sf_dir: str):
    """Bipartite butterfly / wedge counting (Sanei-Mehri et al., *Butterfly
    Counting in Bipartite Networks*): supplier pairs that co-supply ≥ 2
    distinct parts, with the shared-part count — the co-occurrence motif
    behind "related entities" features.

    The wedge space Σ_p C(deg_p, 2) is the classic quadratic blow-up; the
    standard scale defense is a per-part degree cap: parts with more than
    WEDGE_DEG_CAP distinct suppliers are excluded BY RULE (the rule is
    part of the operator's contract and the SQL oracle applies the same
    cap, so results stay exact-by-definition; at the test scales no part
    exceeds the cap — max observed degree 52 at sf0.1 — so the cap only
    binds at 100 TB where it must).

    ONE data shuffle: partition by part (``C.by_partition`` — all rows of
    a part co-locate, so the partition-local distinct + degree +
    wedge-enumeration are globally exact), then a packed-int pair-key
    groupby over per-partition PARTIAL counts. Wedge enumeration is
    vectorized by degree bucket: groups of equal size d reshape to a
    (g, d) matrix and expand through one ``np.triu_indices`` — a loop
    over ≤ CAP distinct sizes, never over parts or rows."""
    memo = _COSUPPLY_MEMO.get(sf_dir)
    if memo is not None:
        return memo
    line = C.read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])

    def loc_dist(b: pd.DataFrame) -> pd.DataFrame:
        return b.drop_duplicates(["l_partkey", "l_suppkey"])

    partials = C.by_partition(
        line.map_batches(loc_dist, batch_format="pandas"),
        "l_partkey",
        _wedge_kernel,
    )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        # bounded-partition pair fold (pairkey co-locates by hash); the
        # native groupby().sum() hash aggregate costs ~4x more in shuffle
        # spin-up than this by_partition kernel at the same exactness
        agg = g.groupby("pairkey", as_index=False)["n"].sum()
        k = agg["pairkey"].to_numpy(np.int64)
        n = agg["n"].to_numpy(np.int64)
        m = n >= 2
        k, n = k[m], n[m]
        return pd.DataFrame(
            {
                "s1": (k // PAIR_MOD).astype("int64"),
                "s2": (k % PAIR_MOD).astype("int64"),
                "n_shared_parts": n.astype("int64"),
            }
        )

    out = C.by_partition(partials, "pairkey", fold).materialize()
    # edge-set-sized (pairs >= 2 shared parts); memoized
    _COSUPPLY_MEMO[sf_dir] = out
    return out


COSUPPLY_SQL = f"""
WITH pair AS (
  SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem
), deg AS (
  SELECT p, count(*) AS d FROM pair GROUP BY p
), keep AS (
  SELECT pair.p, pair.s FROM pair JOIN deg USING (p)
  WHERE d BETWEEN 2 AND {WEDGE_DEG_CAP}
), w AS (
  SELECT a.p, a.s AS s1, b.s AS s2
  FROM keep a JOIN keep b ON a.p = b.p AND a.s < b.s
)
SELECT s1, s2, CAST(count(*) AS BIGINT) AS n_shared_parts
FROM w GROUP BY s1, s2 HAVING count(*) >= 2
"""


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


def graph_triangles(sf_dir: str):
    """Per-node triangle counts (the clustering-coefficient numerator)
    over the co-supply graph — edges are the ``graph_cosupply_pairs``
    output (supplier pairs sharing ≥ 2 parts, canonical s1 < s2).

    The distributed shape is degree-oriented node-iterator triangle
    counting (Schank/Wagner; the MapReduce form is Suri & Vassilvitskii,
    *Counting Triangles and the Curse of the Last Reducer*): every edge
    is directed from its lower-(degree, id) endpoint to the higher one,
    which (a) turns the graph into a DAG so each triangle is found
    exactly once at its lowest-degree apex, and (b) bounds every
    out-degree at O(√m) — the wedge space Σ C(outdeg, 2) stays near-linear
    even with hub nodes, the whole point at 100 TB. Wedges (pairs of
    out-neighbors, packed into one int64 key) co-shuffle with the edge
    set on the closing pair key; a vectorized partition kernel keeps
    wedges whose closing edge exists and credits all three corners.
    Degrees are node-sized (supplier dim) → one broadcast; nothing
    edge-sized ever reaches the driver."""
    import ray as _ray

    edges = graph_cosupply_pairs(sf_dir).materialize()

    def pdeg(b: pd.DataFrame) -> pd.DataFrame:
        s = np.concatenate(
            [b["s1"].to_numpy(np.int64), b["s2"].to_numpy(np.int64)]
        )
        vc = pd.Series(s).value_counts()
        return pd.DataFrame(
            {
                "node": vc.index.to_numpy(np.int64),
                "d": vc.to_numpy(np.int64),
            }
        )

    deg = (
        edges.map_batches(pdeg, batch_format="pandas")
        .to_pandas()
        .groupby("node", as_index=False)["d"]
        .sum()
    )
    dref = C.broadcast(dict(zip(deg["node"].astype(int), deg["d"].astype(int))))

    def orient(b: pd.DataFrame) -> pd.DataFrame:
        dm = _ray.get(dref)
        a = b["s1"].to_numpy(np.int64)
        c = b["s2"].to_numpy(np.int64)
        da = pd.Series(a).map(dm).to_numpy(np.int64)
        dc = pd.Series(c).map(dm).to_numpy(np.int64)
        a_first = (da < dc) | ((da == dc) & (a < c))
        return pd.DataFrame(
            {
                "src": np.where(a_first, a, c),
                "dst": np.where(a_first, c, a),
            }
        )

    oriented = edges.map_batches(orient, batch_format="pandas")

    _W_EMPTY = pd.DataFrame(
        {
            "key": pd.Series(dtype="int64"),
            "apex": pd.Series(dtype="int64"),
            "side": pd.Series(dtype="int8"),
        }
    )

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values(["src", "dst"])
        s = d["src"].to_numpy(np.int64)
        t = d["dst"].to_numpy(np.int64)
        if not len(d):
            return _W_EMPTY
        new = np.ones(len(d), bool)
        new[1:] = s[1:] != s[:-1]
        gid = np.cumsum(new) - 1
        sizes = np.bincount(gid)
        keep = (sizes >= 2)[gid]
        s, t, sz = s[keep], t[keep], sizes[gid[keep]]
        frames = []
        for d0 in np.unique(sz):
            m = sz == d0
            mat = t[m].reshape(-1, d0)  # dst ascend within each src
            apex = s[m].reshape(-1, d0)[:, 0]
            iu, ju = np.triu_indices(d0, k=1)
            frames.append(
                pd.DataFrame(
                    {
                        "key": mat[:, iu].ravel() * PAIR_MOD
                        + mat[:, ju].ravel(),
                        "apex": np.repeat(apex, len(iu)),
                    }
                )
            )
        if not frames:
            return _W_EMPTY
        out = pd.concat(frames, ignore_index=True)
        out["side"] = np.int8(0)
        return out

    wedge_ds = C.by_partition(oriented, "src", wedges)

    def tag_edges(b: pd.DataFrame) -> pd.DataFrame:
        k = (
            b["s1"].to_numpy(np.int64) * PAIR_MOD
            + b["s2"].to_numpy(np.int64)
        )
        return pd.DataFrame(
            {
                "key": k,
                "apex": np.full(len(k), -1, np.int64),
                "side": np.ones(len(k), np.int8),
            }
        )

    edge_side = edges.map_batches(tag_edges, batch_format="pandas")

    def close(g: pd.DataFrame) -> pd.DataFrame:
        ek = g.loc[g["side"] == 1, "key"].unique()
        w = g[(g["side"] == 0) & g["key"].isin(ek)]
        if not len(w):
            return pd.DataFrame(
                {
                    "node": pd.Series(dtype="int64"),
                    "n_triangles": pd.Series(dtype="int64"),
                }
            )
        k = w["key"].to_numpy(np.int64)
        nodes = np.concatenate(
            [w["apex"].to_numpy(np.int64), k // PAIR_MOD, k % PAIR_MOD]
        )
        vc = pd.Series(nodes).value_counts()
        return pd.DataFrame(
            {
                "node": vc.index.to_numpy(np.int64),
                "n_triangles": vc.to_numpy(np.int64),
            }
        )

    parts = C.by_partition(
        wedge_ds.union(edge_side), "key", close
    ).to_pandas()
    if len(parts) == 0:
        return pd.DataFrame(
            {
                "node": pd.Series(dtype="int64"),
                "n_triangles": pd.Series(dtype="int64"),
            }
        )
    out = parts.groupby("node", as_index=False)["n_triangles"].sum()
    out["node"] = out["node"].astype("int64")
    out["n_triangles"] = out["n_triangles"].astype("int64")
    return out.sort_values("node", kind="stable").reset_index(drop=True)


TRIANGLES_SQL = f"""
WITH pair AS (
  SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem
), dg AS (
  SELECT p, count(*) AS d FROM pair GROUP BY p
), keep AS (
  SELECT pair.p, pair.s FROM pair JOIN dg USING (p)
  WHERE d BETWEEN 2 AND {WEDGE_DEG_CAP}
), wd AS (
  SELECT a.p, a.s AS s1, b.s AS s2
  FROM keep a JOIN keep b ON a.p = b.p AND a.s < b.s
), e AS (
  SELECT s1, s2 FROM wd GROUP BY s1, s2 HAVING count(*) >= 2
), tri AS (
  SELECT a.s1 AS x, a.s2 AS y, b.s2 AS z
  FROM e a
  JOIN e b ON b.s1 = a.s2
  JOIN e c ON c.s1 = a.s1 AND c.s2 = b.s2
)
SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
FROM (
  SELECT x AS node FROM tri
  UNION ALL SELECT y FROM tri
  UNION ALL SELECT z FROM tri
)
GROUP BY node ORDER BY node
"""


QUERIES = {
    "graph_pagerank": graph_pagerank,
    "graph_cosupply_pairs": graph_cosupply_pairs,
    "graph_triangles": graph_triangles,
    "graph_bfs_hops": graph_bfs_hops,
    "graph_label_prop": graph_label_prop,
}

ORACLE_SQL = {
    "graph_pagerank": _pagerank_sql(),
    "graph_cosupply_pairs": COSUPPLY_SQL,
    "graph_triangles": TRIANGLES_SQL,
    "graph_bfs_hops": _bfs_sql(),
    "graph_label_prop": _lpa_sql(),
}
