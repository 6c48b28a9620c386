"""Graph-operator laws, verified against independent pure-Python
references (NOT the SQL oracles — those are exercised by
tests/test_queries.py; these pin the math itself)."""

from collections import defaultdict

import numpy as np
import pandas as pd
import pytest

from raycdc.queries.graph import (
    PAIR_MOD,
    PR_BASE,
    PR_ITERS,
    PR_SCALE,
    SUPP_OFF,
    WEDGE_DEG_CAP,
    _wedge_kernel,
)

SF = "/root/testdata/sf0.001"


def _brute_pairs(df: pd.DataFrame) -> dict[int, int]:
    parts: dict[int, set] = defaultdict(set)
    for p, s in df.drop_duplicates().itertuples(index=False):
        parts[int(p)].add(int(s))
    cnt: dict[int, int] = defaultdict(int)
    for ss in parts.values():
        ss = sorted(ss)
        if not (2 <= len(ss) <= WEDGE_DEG_CAP):
            continue
        for i in range(len(ss)):
            for j in range(i + 1, len(ss)):
                cnt[ss[i] * PAIR_MOD + ss[j]] += 1
    return dict(cnt)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_wedge_kernel_matches_bruteforce(seed):
    rng = np.random.RandomState(seed)
    df = pd.DataFrame(
        {
            "l_partkey": rng.randint(0, 40, 600),
            "l_suppkey": rng.randint(0, 25, 600),
        }
    )
    # one part hotter than the cap: must be excluded BY RULE on both sides
    hot = pd.DataFrame(
        {"l_partkey": 999, "l_suppkey": np.arange(WEDGE_DEG_CAP + 5)}
    )
    df = pd.concat([df, hot], ignore_index=True)
    out = _wedge_kernel(df)
    got = dict(zip(out["pairkey"].astype(int), out["n"].astype(int)))
    assert got == _brute_pairs(df)
    assert not any(k // PAIR_MOD == 999 or k % PAIR_MOD == 999 for k in got)


def test_pagerank_matches_pure_python_simulation(ray_session):
    """The distributed integer PageRank equals a per-node dict simulation
    of the same law (floor division, 85/100 damping, PR_ITERS rounds)
    over the same distinct symmetric edge list."""
    import duckdb

    from raycdc.queries.graph import graph_pagerank

    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    pairs = con.execute(
        "SELECT DISTINCT o_custkey, l_suppkey FROM orders "
        "JOIN lineitem ON l_orderkey = o_orderkey"
    ).fetchall()
    adj: dict[int, list[int]] = defaultdict(list)
    for c, s in pairs:
        adj[int(c)].append(int(s) + SUPP_OFF)
        adj[int(s) + SUPP_OFF].append(int(c))
    r = {n: PR_SCALE for n in adj}
    for _ in range(PR_ITERS):
        nxt: dict[int, int] = defaultdict(int)
        for src, outs in adj.items():
            contrib = r[src] // len(outs)
            for dst in outs:
                nxt[dst] += contrib
        r = {n: PR_BASE + (85 * s_) // 100 for n, s_ in nxt.items()}
    got = graph_pagerank(SF).to_pandas()
    gd = dict(zip(got["node"].astype(int), got["pr"].astype(int)))
    assert gd == r


def test_triangles_match_bruteforce(ray_session):
    """graph_triangles equals a pure-Python set-intersection triangle
    count over the same brute-forced co-supply edge set."""
    from raycdc.queries.graph import graph_triangles

    df = pd.read_parquet(
        f"{SF}/lineitem.parquet", columns=["l_partkey", "l_suppkey"]
    )
    edges = [k for k, n in _brute_pairs(df).items() if n >= 2]
    adj: dict[int, set] = defaultdict(set)
    for k in edges:
        a, b = k // PAIR_MOD, k % PAIR_MOD
        adj[a].add(b)
        adj[b].add(a)
    cnt: dict[int, int] = defaultdict(int)
    for a in sorted(adj):
        for b in sorted(adj[a]):
            if b <= a:
                continue
            for c in adj[a] & adj[b]:
                if c > b:
                    for x in (a, b, c):
                        cnt[x] += 1
    got = graph_triangles(SF)
    gd = dict(zip(got["node"].astype(int), got["n_triangles"].astype(int)))
    assert gd == dict(cnt)
