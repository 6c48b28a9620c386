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
    """Per-batch shingle → one signature row per doc, fully vectorized.
    Output: (doc_id, sig) — 512 B of minhashes per doc, computed ONCE; the
    banded key rows are derived from the signature downstream (8 B/key),
    so the expensive shingle pass never re-runs and signatures never ride
    through a shuffle."""

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        n = len(b)
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
        sig_bytes = np.array([s.tobytes() for s in sigs], dtype=object)
        return pd.DataFrame({"doc_id": b["doc_id"].to_numpy(), "sig": sig_bytes})


def _band_hashes(sig_col) -> np.ndarray:
    """(n, NUM_BANDS) int64 bucket keys derived from signature bytes — a
    polynomial mix of each band's minhashes (collisions only cost an extra
    candidate check; the verify stage rechecks full signatures)."""
    rows_per_band = NUM_PERM // NUM_BANDS
    mat = np.frombuffer(b"".join(sig_col), dtype=np.uint64).reshape(
        len(sig_col), NUM_BANDS, rows_per_band
    )
    bh = (mat * _BAND_MIX[None, None, :]).sum(axis=2, dtype=np.uint64)
    bh ^= bh >> np.uint64(31)
    return bh.view(np.int64)


_BUCKET_MIX = np.uint64(0x9E3779B97F4A7C15)


def _bucket_key(band_hash_i64: np.ndarray, band_id: np.ndarray) -> np.ndarray:
    """Fold (band_id, band_hash) into one int64 bucket key (uint64 wrap
    arithmetic; a cross-band collision only adds a candidate check)."""
    bh = np.ascontiguousarray(band_hash_i64, dtype=np.int64).view(np.uint64)
    salt = (band_id.astype(np.uint64) + np.uint64(1)) * _BUCKET_MIX
    return (bh ^ salt).view(np.int64)


def _collided_buckets(keyed) -> np.ndarray:
    """Buckets with occupancy ≥ 2, WITHOUT a groupby: Dataset.groupby
    iterates groups in Python — catastrophic with near-unique keys. A
    global SORT stays fully vectorized (sample + range partition + arrow
    sort); duplicates are then adjacent, so each block reports its internal
    duplicated keys plus its two edge keys, and the driver unions internal
    dups with edge keys seen in ≥2 places (a bucket spanning a block
    boundary). Driver receives O(collided + 2×blocks), never O(corpus)."""
    import pyarrow as pa

    srt = keyed.sort("bucket")

    def block_dups(b):
        v = (
            b.column("bucket").combine_chunks().to_numpy(zero_copy_only=False)
        )
        if len(v) == 0:
            return pa.table(
                {"bucket": pa.array([], pa.int64()),
                 "kind": pa.array([], pa.string())}
            )
        dup_mask = np.zeros(len(v), dtype=bool)
        dup_mask[1:] = v[1:] == v[:-1]
        dups = np.unique(v[dup_mask])
        return pa.table(
            {
                "bucket": pa.array(
                    np.concatenate([dups, [v[0], v[-1]]]), pa.int64()
                ),
                "kind": pa.array(["dup"] * len(dups) + ["edge", "edge"]),
            }
        )

    info = srt.map_batches(block_dups, batch_format="pyarrow").to_pandas()
    edge = info.loc[info["kind"] == "edge", "bucket"]
    edge_hot = edge[edge.duplicated(keep=False)].to_numpy()
    return np.unique(
        np.concatenate(
            [info.loc[info["kind"] == "dup", "bucket"].to_numpy(), edge_hot]
        )
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
    """Scale-safe LSH candidate resolution — no corpus-sized driver gather:

      1. sign every doc ONCE (vectorized map_batches) → a materialized
         (doc_id, sig) index — the one deliberate mid-pipeline
         materialization, 512 B/doc, the LSH analog of persisting a
         signature index;
      2. band keys (pure ints) derive from the signature; bucket occupancy
         is a distributed groupby COUNT over int keys only;
      3. collided buckets (count ≥ 2) are a tiny set — broadcast, filter
         the banded keys to candidate docs in map_batches (vectorized
         isin on the mixed key, no per-row Python);
      4. signatures of candidate docs only are re-exploded to hot-bucket
         rows and verified per bucket (``groupby.map_groups`` — no
         per-singleton-bucket Python calls, only collided buckets exist);
      5. distinct (doc_a, doc_b) via one last (small) groupby.

    Driver materializations: the collided-bucket key set and the candidate
    doc_id set — both O(near-duplicate docs), never O(corpus)."""
    import ray

    sigs = (
        C.read(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(MinHashSigner, batch_format="pandas", concurrency=(1, 8))
        .materialize()
    )
    def bucket_keys(b: pd.DataFrame):
        # bucket-key column ONLY (8 B/row): the occupancy scan needs no
        # doc ids, so none ride through the sort. Arrow out → the sort
        # shuffle stays arrow-native end to end.
        import pyarrow as pa

        bh = _band_hashes(b["sig"].to_numpy())
        band_ids = np.broadcast_to(
            np.arange(NUM_BANDS, dtype=np.int64)[None, :], bh.shape
        )
        return pa.table(
            {"bucket": pa.array(
                _bucket_key(bh.reshape(-1), band_ids.reshape(-1)), pa.int64()
            )}
        )

    keyed = sigs.map_batches(bucket_keys, batch_format="pandas")
    hot = _collided_buckets(keyed)
    if not len(hot):
        return pd.DataFrame(
            {"doc_a": pd.Series(dtype="int64"), "doc_b": pd.Series(dtype="int64"),
             "est_jaccard": pd.Series(dtype="float64")}
        )
    hot_ref = ray.put(hot)  # sorted → np.isin can binary-search

    def hot_band_rows(b: pd.DataFrame) -> pd.DataFrame:
        """Signatures → hot-bucket candidate rows (sig attached); plain
        task fn — the broadcast array is a zero-copy local object-store
        get per batch, no actor pool spin-up."""
        hot_arr = ray.get(hot_ref)
        if not len(b):
            return pd.DataFrame(
                {"bucket": pd.Series(dtype="int64"),
                 "doc_id": pd.Series(dtype="int64"),
                 "sig": pd.Series(dtype="object")}
            )
        bh = _band_hashes(b["sig"].to_numpy())
        band_ids = np.broadcast_to(
            np.arange(NUM_BANDS, dtype=np.int64)[None, :], bh.shape
        )
        key = _bucket_key(bh.reshape(-1), band_ids.reshape(-1))
        out = pd.DataFrame(
            {
                "bucket": key,
                "doc_id": np.repeat(b["doc_id"].to_numpy(), NUM_BANDS),
                "sig": np.repeat(b["sig"].to_numpy(), NUM_BANDS),
            }
        )
        return out[np.isin(out["bucket"].to_numpy(), hot_arr)]

    cand = sigs.map_batches(hot_band_rows, batch_format="pandas")
    pairs = cand.groupby("bucket").map_groups(
        lambda g: BucketPairs()(g), batch_format="pandas"
    )
    # distinct pairs across bands (est_jaccard is band-independent). The
    # verified pair list IS the query result — the caller materializes it
    # either way — so the final dedup runs on the already-small output.
    out = pairs.to_pandas()
    return (
        out.drop_duplicates(["doc_a", "doc_b"])
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )


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


HAMMING_K = 3
_SUB_BANDS = 4  # 4 × 16-bit sub-keys: hamming ≤ 3 → ≥1 identical sub-key


def _simhash_subkeys(sim_i64: np.ndarray) -> np.ndarray:
    """(n, 4) int64 bucket keys — one per 16-bit sub-band of the 64-bit
    SimHash (pigeonhole: two signatures within hamming distance 3 must
    agree on at least one of the 4 sub-bands)."""
    v = np.ascontiguousarray(sim_i64, dtype=np.int64).view(np.uint64)
    parts = np.stack(
        [
            ((v >> np.uint64(16 * i)) & np.uint64(0xFFFF)).view(np.int64)
            for i in range(_SUB_BANDS)
        ],
        axis=1,
    )
    band_ids = np.broadcast_to(
        np.arange(_SUB_BANDS, dtype=np.int64)[None, :], parts.shape
    )
    return _bucket_key(parts.reshape(-1), band_ids.reshape(-1)).reshape(
        -1, _SUB_BANDS
    )


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (SWAR — no numpy>=2 bit_count needed)."""
    x = x.astype(np.uint64, copy=True)
    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = (x & np.uint64(0x3333333333333333)) + (
        (x >> np.uint64(2)) & np.uint64(0x3333333333333333)
    )
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return ((x * np.uint64(0x0101010101010101)) >> np.uint64(56)).astype(
        np.int64
    )


def dedup_simhash_hamming(sf_dir: str):
    """Hamming-≤k SimHash near-dup pairs at scale: the pigeonhole-banded
    search the plain `dedup_simhash` docstring promises. Sign once →
    4 × 16-bit sub-band bucket keys → collided buckets via the sorted
    occupancy scan → per-bucket pairwise XOR-popcount verify → distinct
    pairs. Same no-driver-gather shape as MinHash LSH."""
    import ray

    sigs = (
        C.read(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(SimHasher, batch_format="pandas", concurrency=(1, 8))
        .materialize()
    )

    def sub_keys(b: pd.DataFrame):
        import pyarrow as pa

        keys = _simhash_subkeys(b["simhash"].to_numpy())
        return pa.table({"bucket": pa.array(keys.reshape(-1), pa.int64())})

    hot = _collided_buckets(sigs.map_batches(sub_keys, batch_format="pandas"))
    if not len(hot):
        return pd.DataFrame(
            {"doc_a": pd.Series(dtype="int64"), "doc_b": pd.Series(dtype="int64"),
             "hamming": pd.Series(dtype="int64")}
        )
    hot_ref = ray.put(hot)

    def hot_rows(b: pd.DataFrame) -> pd.DataFrame:
        hot_arr = ray.get(hot_ref)
        keys = _simhash_subkeys(b["simhash"].to_numpy())
        out = pd.DataFrame(
            {
                "bucket": keys.reshape(-1),
                "doc_id": np.repeat(b["doc_id"].to_numpy(), _SUB_BANDS),
                "simhash": np.repeat(b["simhash"].to_numpy(), _SUB_BANDS),
            }
        )
        return out[np.isin(out["bucket"].to_numpy(), hot_arr)]

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("doc_id").sort_values("doc_id")
        if len(g) > 4096:
            # non-discriminative sub-band (16-bit space saturates on large
            # corpora with skewed bit distributions): skip — a true
            # hamming≤k pair still collides on one of the other 3 bands
            # unless every band saturates; standard LSH bucket capping
            return pd.DataFrame(
                {"doc_a": pd.Series(dtype="int64"),
                 "doc_b": pd.Series(dtype="int64"),
                 "hamming": pd.Series(dtype="int64")}
            )
        if len(g) < 2:
            return pd.DataFrame(
                {"doc_a": pd.Series(dtype="int64"),
                 "doc_b": pd.Series(dtype="int64"),
                 "hamming": pd.Series(dtype="int64")}
            )
        ids = g["doc_id"].to_numpy()
        sims = np.ascontiguousarray(
            g["simhash"].to_numpy(), dtype=np.int64
        ).view(np.uint64)
        rows = []
        for i in range(len(ids) - 1):
            d = _popcount64(np.bitwise_xor(sims[i + 1 :], sims[i]))
            for j in np.flatnonzero(d <= HAMMING_K):
                rows.append((int(ids[i]), int(ids[i + 1 + j]), int(d[j])))
        return pd.DataFrame(rows, columns=["doc_a", "doc_b", "hamming"])

    pairs = (
        sigs.map_batches(hot_rows, batch_format="pandas")
        .groupby("bucket")
        .map_groups(lambda g: bucket_pairs(g), batch_format="pandas")
    )
    out = pairs.to_pandas()
    return (
        out.drop_duplicates(["doc_a", "doc_b"])
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )


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


NGRAM_JACCARD_SQL = """
WITH toks AS (
    SELECT doc_id, CAST(doc_id // 2 AS BIGINT) AS pair_key,
           list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS t
    FROM documents
), tris AS (
    -- word trigrams as STRINGS: equal iff the Ray side's hashed trigrams
    -- are equal (64-bit hash collisions aside), so set Jaccard matches
    SELECT doc_id, pair_key,
        CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
             ELSE list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                                 for i in generate_series(1, len(t) - 2)])
        END AS s
    FROM toks
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
    round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
          GREATEST(len(list_distinct(list_concat(a.s, b.s))), 1), 6) AS jaccard
FROM tris a
JOIN tris b ON a.pair_key = b.pair_key AND a.doc_id % 2 = 0
           AND b.doc_id = a.doc_id + 1
"""

QUERIES = {
    "dedup_minhash_pairs": dedup_minhash_pairs,
    "dedup_simhash": dedup_simhash,
    "dedup_simhash_hamming": dedup_simhash_hamming,
    "ngram_jaccard_pairs": ngram_jaccard_pairs,
}

# MinHash/SimHash signatures derive from a Python-side hash family and are
# not SQL-expressible; exact n-gram Jaccard IS (the hashes cancel out under
# set operations)
ORACLE_SQL = {
    "ngram_jaccard_pairs": NGRAM_JACCARD_SQL,
}
