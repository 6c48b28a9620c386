"""Near-duplicate detection over ``documents``: MinHash+LSH, SimHash,
n-gram Jaccard verification — the scale path for fuzzy dedup (task brief).

Pipeline shape (MinHash): shingle+sign per batch (stateless, vectorized) →
explode to (band_id, band_hash, doc_id, signature) rows → bucket-occupancy
count (distributed groupby over the key columns only) → broadcast the tiny
collided-bucket set → distributed filter to candidates → per-bucket pair
verify → distinct pairs. All shuffle keys are small ints/hashes; signatures
ride along as fixed-size binary, never the text; nothing corpus-sized ever
lands on the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ray.data.aggregate import Count, Max

from raycdc.queries import common as C

NUM_PERM = 64
NUM_BANDS = 16  # 4 rows/band
SHINGLE_W = 3
JACCARD_THRESHOLD = 0.5

_MERSENNE = np.uint64((1 << 61) - 1)
_rng = np.random.RandomState(1234)  # fixed: the permutation family is part of the spec
_A = _rng.randint(1, (1 << 61) - 1, size=NUM_PERM).astype(np.uint64)
_B = _rng.randint(0, (1 << 61) - 1, size=NUM_PERM).astype(np.uint64)


def _shingle_hashes(text: str) -> np.ndarray:
    toks = text.split()
    if len(toks) < SHINGLE_W:
        shingles = [" ".join(toks)] if toks else [""]
    else:
        shingles = [" ".join(toks[i : i + SHINGLE_W]) for i in range(len(toks) - SHINGLE_W + 1)]
    return pd.util.hash_array(np.asarray(shingles, dtype=object))


def _minhash_sig(text: str) -> np.ndarray:
    sh = _shingle_hashes(text).astype(np.uint64) & _MERSENNE
    # K permutations at once: (K, n) = a[:,None]*sh[None,:] + b mod p
    vals = (_A[:, None] * sh[None, :] + _B[:, None]) % _MERSENNE
    return vals.min(axis=1)


# per-row mixing constants for the (deterministic) band bucket key
_BAND_MIX = np.random.RandomState(99).randint(
    1, 2**63 - 1, size=NUM_PERM // NUM_BANDS
).astype(np.uint64)


class MinHashSigner:
    """Per-batch shingle → signature → banded rows, fully vectorized: one
    output DataFrame per batch (doc_id × band rows). The band bucket key is
    a polynomial mix of the band's minhashes (collisions only cost an extra
    candidate check — the verify stage rechecks full signatures)."""

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        n = len(b)
        rows_per_band = NUM_PERM // NUM_BANDS
        texts = b["text"].to_numpy()
        # batch-vectorized: hash ALL shingles of the batch at once, then one
        # (K × total_shingles) permutation pass + per-doc segment minima
        all_shingles: list = []
        bounds = [0]
        for t in texts:
            toks = t.split()
            if len(toks) < SHINGLE_W:
                all_shingles.append(" ".join(toks))
            else:
                all_shingles.extend(
                    " ".join(toks[i : i + SHINGLE_W])
                    for i in range(len(toks) - SHINGLE_W + 1)
                )
            bounds.append(len(all_shingles))
        sh = pd.util.hash_array(
            np.asarray(all_shingles, dtype=object)
        ).astype(np.uint64) & _MERSENNE
        starts = np.asarray(bounds[:-1])
        sigs = np.empty((n, NUM_PERM), dtype=np.uint64)
        for k in range(NUM_PERM):
            vals = (_A[k] * sh + _B[k]) % _MERSENNE
            sigs[:, k] = np.minimum.reduceat(vals, starts)
        bands = sigs.reshape(n, NUM_BANDS, rows_per_band)
        band_hash = (bands * _BAND_MIX[None, None, :]).sum(axis=2, dtype=np.uint64)
        band_hash ^= band_hash >> np.uint64(31)
        sig_bytes = np.array([s.tobytes() for s in sigs], dtype=object)
        return pd.DataFrame(
            {
                "band_id": np.tile(np.arange(NUM_BANDS, dtype=np.int32), n),
                "band_hash": band_hash.reshape(-1).view(np.int64),
                "doc_id": np.repeat(b["doc_id"].to_numpy(), NUM_BANDS),
                "sig": np.repeat(sig_bytes, NUM_BANDS),
            }
        )


class BucketPairs:
    """Candidate pairs inside one (band_id, band_hash) bucket, verified by
    signature-estimated Jaccard (fraction of equal minhashes)."""

    def __call__(self, g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame(
                {"doc_a": pd.Series(dtype="int64"), "doc_b": pd.Series(dtype="int64"),
                 "est_jaccard": pd.Series(dtype="float64")}
            )
        g = g.drop_duplicates("doc_id").sort_values("doc_id")
        ids = g["doc_id"].to_numpy()
        sigs = np.stack([np.frombuffer(s, dtype=np.uint64) for s in g["sig"]])
        rows = []
        for i in range(len(ids)):
            eq = (sigs[i + 1 :] == sigs[i]).mean(axis=1)
            hit = np.flatnonzero(eq >= JACCARD_THRESHOLD)
            for j in hit:
                rows.append((int(ids[i]), int(ids[i + 1 + j]), round(float(eq[j]), 6)))
        return pd.DataFrame(rows, columns=["doc_a", "doc_b", "est_jaccard"])


def dedup_minhash_pairs(sf_dir: str):
    """Scale-safe LSH candidate resolution — no driver-side gather:

      1. sign + band every doc (stateless vectorized map_batches);
      2. bucket occupancy via a distributed groupby COUNT over the key
         columns only (signatures pruned before the shuffle);
      3. collided buckets (count ≥ 2) are a tiny set — broadcast it via
         ``ray.put`` and filter banded rows to candidates in map_batches;
      4. per-bucket signature verify (``groupby.map_groups``) runs only on
         collided buckets, so there are no per-singleton Python calls;
      5. distinct (doc_a, doc_b) via one last (small) groupby.

    The only driver materialization is the collided-bucket key set, whose
    size is O(near-duplicate docs × bands), not O(corpus)."""
    import ray

    banded = C.read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        lambda b: MinHashSigner()(b), batch_format="pandas"
    )
    # occupancy count: prune sig/doc_id before the shuffle (keys only)
    counts = (
        banded.select_columns(["band_id", "band_hash"])
        .groupby(["band_id", "band_hash"])
        .aggregate(Count(alias_name="n"))
    )
    hot = counts.filter(lambda r: r["n"] >= 2).to_pandas()  # tiny: collided only
    if not len(hot):
        return pd.DataFrame(
            {"doc_a": pd.Series(dtype="int64"), "doc_b": pd.Series(dtype="int64"),
             "est_jaccard": pd.Series(dtype="float64")}
        )
    hot_ref = ray.put(
        set(zip(hot["band_id"].astype(int), hot["band_hash"].astype(int)))
    )

    class FilterHot:
        def __init__(self):
            self.hot = ray.get(hot_ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            keys = list(zip(b["band_id"].astype(int), b["band_hash"].astype(int)))
            mask = np.fromiter((k in self.hot for k in keys), bool, len(keys))
            return b[mask]

    cand = banded.map_batches(FilterHot, batch_format="pandas", concurrency=(1, 8))
    pairs = cand.groupby(["band_id", "band_hash"]).map_groups(
        BucketPairs, batch_format="pandas", concurrency=(1, 8)
    )
    # distinct pairs across bands (est_jaccard is band-independent)
    out = (
        pairs.groupby(["doc_a", "doc_b"])
        .aggregate(Max("est_jaccard", alias_name="est_jaccard"))
        .sort(["doc_a", "doc_b"])
    )
    return out


# -- SimHash ---------------------------------------------------------------

class SimHasher:
    """64-bit SimHash over word unigrams — batch-vectorized: hash every
    token of the batch at once, expand to a bit matrix, one segmented
    ``add.reduceat`` for the per-doc bit votes."""

    _POW2 = (np.uint64(1) << np.arange(64, dtype=np.uint64))

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        texts = b["text"].to_numpy()
        toks_per_doc: list = []
        bounds = [0]
        for t in texts:
            toks_per_doc.extend(t.split())
            bounds.append(len(toks_per_doc))
        starts = np.asarray(bounds[:-1])
        counts = np.diff(bounds)
        if not toks_per_doc:
            return pd.DataFrame(
                {"doc_id": b["doc_id"], "simhash": np.zeros(len(b), np.int64)}
            )
        hs = pd.util.hash_array(
            np.asarray(toks_per_doc, dtype=object)
        ).astype(np.uint64)
        bits = (
            (hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1
        ).astype(np.int32)
        votes = np.add.reduceat(2 * bits - 1, np.minimum(starts, len(hs) - 1), axis=0)
        sig = ((votes > 0).astype(np.uint64) * self._POW2[None, :]).sum(
            axis=1, dtype=np.uint64
        )
        sig[counts == 0] = 0  # reduceat misreads empty segments
        return pd.DataFrame({"doc_id": b["doc_id"], "simhash": sig.view(np.int64)})


def dedup_simhash(sf_dir: str):
    """SimHash per doc + exact-signature duplicate groups (hamming-0).
    Bucketed hamming-k search would group by 4 × 16-bit sub-keys — the
    plumbing is the same groupby."""
    ds = C.read(sf_dir, "documents", ["doc_id", "text"])
    sigs = ds.map_batches(SimHasher, batch_format="pandas", concurrency=(1, 8))

    def group_dups(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id")
        return pd.DataFrame(
            {
                "simhash": g["simhash"].iloc[:1],
                "n_docs": [len(g)],
                "canonical_doc": g["doc_id"].iloc[:1],
            }
        )

    return sigs.groupby("simhash").map_groups(group_dups, batch_format="pandas")


# -- exact n-gram Jaccard on a deterministic candidate set -----------------

def ngram_jaccard_pairs(sf_dir: str):
    """True word-trigram Jaccard for a deterministic candidate set
    (consecutive doc_id pairs) — the verify kernel used after LSH, exposed
    standalone."""
    ds = C.read(sf_dir, "documents", ["doc_id", "text"])

    def shingles(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["pair_key"] = (b["doc_id"] // 2).astype("int64")
        return b[["pair_key", "doc_id", "text"]]

    def jaccard(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) != 2:
            return pd.DataFrame(
                {"doc_a": pd.Series(dtype="int64"), "doc_b": pd.Series(dtype="int64"),
                 "jaccard": pd.Series(dtype="float64")}
            )
        g = g.sort_values("doc_id")
        sets = [set(map(int, _shingle_hashes(t))) for t in g["text"]]
        inter = len(sets[0] & sets[1])
        union = len(sets[0] | sets[1]) or 1
        return pd.DataFrame(
            {
                "doc_a": [int(g["doc_id"].iloc[0])],
                "doc_b": [int(g["doc_id"].iloc[1])],
                "jaccard": [round(inter / union, 6)],
            }
        )

    return (
        ds.map_batches(shingles, batch_format="pandas")
        .groupby("pair_key")
        .map_groups(jaccard, batch_format="pandas")
    )


QUERIES = {
    "dedup_minhash_pairs": dedup_minhash_pairs,
    "dedup_simhash": dedup_simhash,
    "ngram_jaccard_pairs": ngram_jaccard_pairs,
}

ORACLE_SQL: dict = {}  # signature-based near-dup is not SQL-expressible
