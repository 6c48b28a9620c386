"""Similarity search over the ``embeddings`` table: brute-force cosine
top-k (baseline), IVF-bucketed ANN (scale path), embedding-cosine near-dup.

Scale shape: the query matrix is broadcast once (``ray.put``); each batch
does one float64 matmul against it — no shuffle. The IVF variant buckets by
nearest centroid (deterministic seeded k-means) so candidate generation
touches one bucket per query at scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from raycdc.queries import common as C

TOP_K = 20
QUERY_VEC_ID = 0


def _emb_matrix(df: pd.DataFrame) -> np.ndarray:
    return np.stack(df["embedding"].to_numpy()).astype(np.float64)


def ann_bruteforce(sf_dir: str):
    """Exact cosine top-k against the embedding of vec_id=0. Per-batch
    float64 dot products against a broadcast unit query vector; global
    top-k by sort+limit (deterministic vec_id tie-break)."""
    import ray

    # prune at the read: only the query row leaves storage
    q_df = C.read_pandas(
        sf_dir, "embeddings", ["vec_id", "embedding"],
        filters=[("vec_id", "=", QUERY_VEC_ID)],
    )
    q = _emb_matrix(q_df)[0]
    q = q / np.linalg.norm(q)
    ref = ray.put(q)

    ds = C.read(sf_dir, "embeddings", ["vec_id", "embedding"])

    class Score:
        def __init__(self):
            self.q = ray.get(ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            m = _emb_matrix(b)
            norms = np.linalg.norm(m, axis=1)
            norms[norms == 0] = 1.0
            sims = (m @ self.q) / norms
            return pd.DataFrame(
                {"vec_id": b["vec_id"].to_numpy(), "cosine_sim": np.round(sims, 4)}
            )

    return (
        ds.map_batches(Score, batch_format="pandas", concurrency=(1, 8))
        .sort(["cosine_sim", "vec_id"], descending=[True, False])
        .limit(TOP_K)
    )


ANN_BRUTE_SQL = f"""
SELECT e.vec_id,
       round(CAST(list_cosine_similarity(e.embedding, q.embedding) AS DOUBLE), 4) AS cosine_sim
FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = {QUERY_VEC_ID}) q
ORDER BY cosine_sim DESC, e.vec_id LIMIT {TOP_K}
"""


def embedding_norms(sf_dir: str):
    ds = C.read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def norm(b: pd.DataFrame) -> pd.DataFrame:
        m = _emb_matrix(b)
        return pd.DataFrame(
            {
                "vec_id": b["vec_id"].to_numpy(),
                "l2_norm": np.round(np.linalg.norm(m, axis=1), 4),
                "dim": np.int64(m.shape[1]),
            }
        )

    return ds.map_batches(norm, batch_format="pandas")


NORMS_SQL = """
SELECT vec_id,
       round(sqrt(list_sum(list_transform(embedding, x -> x * x))), 4) AS l2_norm,
       CAST(length(embedding) AS BIGINT) AS dim
FROM embeddings
"""


# -- IVF-bucketed ANN (the 100-TB path) ------------------------------------

N_CENTROIDS = 8
KMEANS_ITERS = 5


def _kmeans(mat: np.ndarray, k: int, iters: int) -> np.ndarray:
    """Tiny deterministic k-means (seeded init, fixed iterations) for the
    coarse quantizer. At real scale this trains on a driver-side sample and
    is broadcast; the per-row assign stays in map_batches."""
    rng = np.random.RandomState(42)
    cent = mat[rng.choice(len(mat), size=k, replace=False)]
    for _ in range(iters):
        d = ((mat[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(k):
            m = mat[assign == c]
            if len(m):
                cent[c] = m.mean(axis=0)
    return cent


TRAIN_SAMPLE = 2000


def ann_ivf(sf_dir: str):
    """IVF: train a coarse quantizer on a BOUNDED driver-side sample
    (``Dataset.limit`` — never the full table), broadcast centroids, assign
    rows to inverted lists in map_batches, then search only the query's
    nearest ``nprobe=2`` lists."""
    import ray

    sample = (
        C.read(sf_dir, "embeddings", ["embedding"]).limit(TRAIN_SAMPLE).to_pandas()
    )
    cent = _kmeans(_emb_matrix(sample), N_CENTROIDS, KMEANS_ITERS)
    q_df = C.read_pandas(
        sf_dir, "embeddings", ["vec_id", "embedding"],
        filters=[("vec_id", "=", QUERY_VEC_ID)],
    )
    q = _emb_matrix(q_df)[0]
    qn = q / np.linalg.norm(q)
    probe = np.argsort(((cent - q) ** 2).sum(axis=1))[:2]
    ref = ray.put((cent, qn, set(int(x) for x in probe)))

    ds = C.read(sf_dir, "embeddings", ["vec_id", "embedding"])

    class ProbeScore:
        def __init__(self):
            self.cent, self.q, self.probe = ray.get(ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            m = _emb_matrix(b)
            d = ((m[:, None, :] - self.cent[None, :, :]) ** 2).sum(axis=2)
            lists = d.argmin(axis=1)
            mask = np.isin(lists, list(self.probe))
            m, ids = m[mask], b["vec_id"].to_numpy()[mask]
            if len(m) == 0:
                return pd.DataFrame(
                    {"vec_id": pd.Series(dtype="int64"), "cosine_sim": pd.Series(dtype="float64")}
                )
            norms = np.linalg.norm(m, axis=1)
            norms[norms == 0] = 1.0
            sims = (m @ self.q) / norms
            return pd.DataFrame({"vec_id": ids, "cosine_sim": np.round(sims, 4)})

    return (
        ds.map_batches(ProbeScore, batch_format="pandas", concurrency=(1, 8))
        .sort(["cosine_sim", "vec_id"], descending=[True, False])
        .limit(TOP_K)
    )


# -- embedding-cosine near-dup (restricted pair space, SQL-checkable) ------

NEARDUP_LIMIT_IDS = 400
NEARDUP_COS = 0.4


def embedding_neardup(sf_dir: str):
    """All pairs with cosine ≥ NEARDUP_COS among vec_id < 400 (restriction keeps
    the oracle cross-join tractable; the Ray side blocks the same space).
    At scale the pair space comes from LSH/IVF buckets instead."""
    import ray

    # both sides of the pair space are pruned AT THE READ (row-group
    # predicate pushdown): neither the driver nor the scan touches rows
    # outside vec_id < NEARDUP_LIMIT_IDS
    base = C.read_pandas(
        sf_dir, "embeddings", ["vec_id", "embedding"],
        filters=[("vec_id", "<", NEARDUP_LIMIT_IDS)],
    ).sort_values("vec_id")
    m = _emb_matrix(base)
    n = np.linalg.norm(m, axis=1)
    n[n == 0] = 1.0
    ref = ray.put((m / n[:, None], base["vec_id"].to_numpy()))

    import pyarrow.dataset as pads

    ds = C.read(
        sf_dir, "embeddings", ["vec_id", "embedding"],
        filter=(pads.field("vec_id") < NEARDUP_LIMIT_IDS),
    )

    class Pairs:
        def __init__(self):
            self.mat, self.ids = ray.get(ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            b = b[b["vec_id"] < NEARDUP_LIMIT_IDS]
            if len(b) == 0:
                return pd.DataFrame(
                    {"vec_a": pd.Series(dtype="int64"), "vec_b": pd.Series(dtype="int64"),
                     "cosine_sim": pd.Series(dtype="float64")}
                )
            m = _emb_matrix(b)
            nm = np.linalg.norm(m, axis=1)
            nm[nm == 0] = 1.0
            sims = (m / nm[:, None]) @ self.mat.T
            rows_a, rows_b = np.nonzero(sims >= NEARDUP_COS)
            ia = b["vec_id"].to_numpy()[rows_a]
            ib = self.ids[rows_b]
            keep = ia < ib
            return pd.DataFrame(
                {
                    "vec_a": ia[keep],
                    "vec_b": ib[keep],
                    "cosine_sim": np.round(sims[rows_a, rows_b][keep], 4),
                }
            )

    return ds.map_batches(Pairs, batch_format="pandas", concurrency=(1, 8))


NEARDUP_SQL = f"""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(CAST(list_cosine_similarity(a.embedding, b.embedding) AS DOUBLE), 4) AS cosine_sim
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE a.vec_id < {NEARDUP_LIMIT_IDS} AND b.vec_id < {NEARDUP_LIMIT_IDS}
  AND CAST(list_cosine_similarity(a.embedding, b.embedding) AS DOUBLE) >= {NEARDUP_COS}
"""


QUERIES = {
    "ann_bruteforce": ann_bruteforce,
    "ann_ivf": ann_ivf,
    "embedding_norms": embedding_norms,
    "embedding_neardup": embedding_neardup,
}

ORACLE_SQL = {
    "ann_bruteforce": ANN_BRUTE_SQL,
    "embedding_norms": NORMS_SQL,
    "embedding_neardup": NEARDUP_SQL,
}
