"""Near-duplicate detection over ``documents``: MinHash+LSH, SimHash,
n-gram Jaccard verification — the scale path for fuzzy dedup (task brief).

Pipeline shape (MinHash): shingle+sign per batch (stateless, vectorized) →
explode to (band_id, band_hash, doc_id, signature) rows → bucket-occupancy
count (distributed sorted scan over the key columns only) → broadcast the
tiny collided-bucket set → distributed filter to candidates → per-bucket
pair verify → distinct pairs. All shuffle keys are small ints/hashes;
signatures ride along as fixed-size binary, never the text; nothing
corpus-sized ever lands on the driver.

Every signature derives from the portable polynomial hash family
(raycdc.phash), so the FULL LSH semantics — signatures, band collisions,
estimated Jaccard — are reproduced exactly by the DuckDB oracle SQL below
(driver-verifiable, not just planted-dup tested).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from raycdc import phash as H
from raycdc import textkit as T
from raycdc.queries import common as C

NUM_PERM = 64
NUM_BANDS = 16  # 4 rows/band
SHINGLE_W = 3
JACCARD_THRESHOLD = 0.5

_P = np.uint64(H.P)


def _shingle_strings(text: str) -> list:
    toks = T.py_tokens(text)  # RE2-\s-identical tokenization (textkit)
    if len(toks) < SHINGLE_W:
        return [" ".join(toks)]
    return [" ".join(toks[i : i + SHINGLE_W]) for i in range(len(toks) - SHINGLE_W + 1)]


# per-row mixing constants for the (deterministic) band bucket key
_BAND_MIX = np.random.RandomState(99).randint(
    1, 2**63 - 1, size=NUM_PERM // NUM_BANDS
).astype(np.uint64)


def minhash_sign(b: pd.DataFrame) -> pd.DataFrame:
    """Per-batch shingle → one signature row per doc, fully vectorized
    (stateless task fn — no actor pool spin-up). Output: (doc_id, sig) —
    512 B of minhashes per doc, computed ONCE; the banded key rows are
    derived from the signature downstream (8 B/key), so the expensive
    shingle pass never re-runs and signatures never ride through a
    shuffle."""
    n = len(b)
    texts = b["text"].to_numpy()
    # batch-vectorized: hash ALL shingles of the batch at once (portable
    # poly hash), then one affine-permutation pass + per-doc segment minima
    all_shingles: list = []
    bounds = [0]
    for t in texts:
        all_shingles.extend(_shingle_strings(t))
        bounds.append(len(all_shingles))
    sh = H.poly_hash(all_shingles)
    starts = np.asarray(bounds[:-1])
    sigs = np.empty((n, NUM_PERM), dtype=np.uint64)
    for k in range(NUM_PERM):
        vals = (H.MINHASH_A[k] * sh + H.MINHASH_B[k]) % _P
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


def _segmented_verify(bucket_fn):
    """Partition kernel factory: all rows of many buckets co-located on one
    bounded hash partition → sort by bucket, walk the segment boundaries,
    run the (numpy-vectorized) per-bucket verifier on each slice. The
    Python iteration is over COLLIDED buckets inside one kernel call —
    Ray never materializes a per-bucket group, so scheduler overhead is
    O(partitions), not O(buckets)."""

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("bucket", kind="stable").reset_index(drop=True)
        v = g["bucket"].to_numpy()
        bounds = np.flatnonzero(np.r_[True, v[1:] != v[:-1], True])
        frames = [
            bucket_fn(g.iloc[s:e])
            for s, e in zip(bounds[:-1], bounds[1:])
            if e - s >= 2
        ]
        if not frames:
            return bucket_fn(g.iloc[0:0])
        return pd.concat(frames, ignore_index=True)

    return kernel


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

      1. sign every doc ONCE (vectorized map_batches task fn) → a
         materialized (doc_id, sig) index — the one deliberate
         mid-pipeline materialization, 512 B/doc, the LSH analog of
         persisting a signature index;
      2. band keys (pure ints) derive from the signature; bucket occupancy
         comes from a distributed sorted scan over int keys only;
      3. collided buckets (count ≥ 2) are a tiny set — broadcast, filter
         the banded keys to candidate docs in map_batches (vectorized
         isin on the mixed key, no per-row Python);
      4. signatures of candidate docs only are re-exploded to hot-bucket
         rows, co-located on BOUNDED hash partitions (``C.by_partition``),
         and verified bucket-by-bucket inside ONE partition kernel
         (sorted segment walk) — Ray never schedules a per-bucket group;
      5. distinct (doc_a, doc_b) via one last (small) dedup.

    Driver materializations: the collided-bucket key set and the verified
    pair list — both O(near-duplicate docs), never O(corpus)."""
    import ray

    sigs = (
        C.read(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(minhash_sign, batch_format="pandas")
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
    pairs = C.by_partition(
        cand, "bucket", _segmented_verify(BucketPairs())
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

def simhash_batch(b: pd.DataFrame) -> pd.DataFrame:
    """64-bit SimHash per doc — the shared ``raycdc.phash.simhash64``
    kernel (batch-vectorized, batch-composition-independent), also used by
    the lake's incrementally-maintained ``text_fp`` fingerprint index."""
    texts = b["text"].to_numpy()
    return pd.DataFrame({"doc_id": b["doc_id"], "simhash": H.simhash64(texts)})


def dedup_simhash(sf_dir: str):
    """SimHash per doc + exact-signature duplicate groups (hamming-0):
    (simhash, n_docs, canonical_doc) via NATIVE distributed aggregates —
    no per-group Python on the near-unique signature key."""
    from ray.data.aggregate import Count, Min

    ds = C.read(sf_dir, "documents", ["doc_id", "text"])
    sigs = ds.map_batches(simhash_batch, batch_format="pandas")
    out = sigs.groupby("simhash").aggregate(
        Count(alias_name="n_docs"), Min("doc_id", alias_name="canonical_doc")
    )

    def pin(b: pd.DataFrame) -> pd.DataFrame:
        b["n_docs"] = b["n_docs"].astype("int64")
        b["canonical_doc"] = b["canonical_doc"].astype("int64")
        return b

    return out.map_batches(pin, batch_format="pandas")


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
    search. Sign once → 4 × 16-bit sub-band bucket keys → collided buckets
    via the sorted occupancy scan → per-bucket pairwise XOR-popcount verify
    → distinct pairs. Same no-driver-gather shape as MinHash LSH.

    Pigeonhole recall is exactly 1 (below the saturated-band cap), so the
    output equals the brute-force hamming-≤k pair set — which the DuckDB
    oracle computes directly from the SQL-expressed signatures."""
    import ray

    sigs = (
        C.read(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(simhash_batch, batch_format="pandas")
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
        if not rows:
            return pd.DataFrame(
                {"doc_a": pd.Series(dtype="int64"),
                 "doc_b": pd.Series(dtype="int64"),
                 "hamming": pd.Series(dtype="int64")}
            )
        return pd.DataFrame(rows, columns=["doc_a", "doc_b", "hamming"])

    pairs = C.by_partition(
        sigs.map_batches(hot_rows, batch_format="pandas"),
        "bucket",
        _segmented_verify(bucket_pairs),
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
    standalone. Compares trigram STRING sets (no hashing), so the oracle
    match is exact by construction.

    Scale shape: pairs are co-located on BOUNDED hash partitions (pair_key
    is near-unique — one Ray group per pair would be per-pair Python); the
    per-partition kernel explodes distinct (doc, trigram) rows and derives
    intersection/union with C-speed pandas hash aggregates."""
    ds = C.read(sf_dir, "documents", ["doc_id", "text"])

    def shingles(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["pair_key"] = (b["doc_id"] // 2).astype("int64")
        return b[["pair_key", "doc_id", "text"]]

    def jaccard(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"doc_a": pd.Series(dtype="int64"), "doc_b": pd.Series(dtype="int64"),
             "jaccard": pd.Series(dtype="float64")}
        )
        # only complete pairs (exactly 2 docs per key) are verified
        g = g[g.groupby("pair_key")["doc_id"].transform("size") == 2]
        if len(g) == 0:
            return empty
        texts = g["text"].to_numpy()
        tris: list = []
        bounds = [0]
        for t in texts:  # batch-level shingle builder (string work per doc)
            tris.extend(_shingle_strings(t))
            bounds.append(len(tris))
        counts = np.diff(bounds)
        ex = pd.DataFrame(
            {
                "pair_key": np.repeat(g["pair_key"].to_numpy(), counts),
                "doc_id": np.repeat(g["doc_id"].to_numpy(), counts),
                "tri": tris,
            }
        ).drop_duplicates(["doc_id", "tri"])
        per_tri = (
            ex.groupby(["pair_key", "tri"], sort=False)
            .size()
            .reset_index(name="n_docs")
        )
        union = per_tri.groupby("pair_key").size()
        inter = (
            per_tri[per_tri["n_docs"] == 2].groupby("pair_key").size()
        ).reindex(union.index, fill_value=0)
        ids = g.groupby("pair_key")["doc_id"].agg(["min", "max"])
        out = pd.DataFrame(
            {
                "doc_a": ids["min"].astype("int64"),
                "doc_b": ids["max"].astype("int64"),
                "jaccard": (inter / union.clip(lower=1)).round(6),
            }
        ).reset_index(drop=True)
        return out

    prepped = ds.map_batches(shingles, batch_format="pandas")
    return C.by_partition(prepped, "pair_key", jaccard)


# -- DuckDB oracle SQL (exact signature semantics, portable hash) ----------

# shared CTE: word tokens per doc (textkit semantics — identical to
# T.py_tokens on every input, unicode whitespace included)
_TOKS_CTE = f"""
toks AS (
    SELECT doc_id, {T.toks_sql('text')} AS t
    FROM documents
)"""

# word trigram shingles (W=3), '' for token-less docs — matches
# _shingle_strings
_SHINGLES_CTE = """
sh AS (
    SELECT doc_id,
        CASE WHEN len(t) = 0 THEN ['']
             WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
             ELSE [t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                   for i in generate_series(1, len(t) - 2)]
        END AS s
    FROM toks
)"""

_MINHASH_SIG_CTE = f"""
hs AS (
    SELECT doc_id, list_transform(s, x -> {H.sql_poly('x')}) AS h FROM sh
), sig AS (
    SELECT doc_id,
        [list_min(list_transform(h, v -> (p[1]*v + p[2]) % {H.P}))
         for p in {H.sql_pairs(H.MINHASH_A, H.MINHASH_B)}] AS sig
    FROM hs
)"""

MINHASH_PAIRS_SQL = f"""
WITH {_TOKS_CTE}, {_SHINGLES_CTE}, {_MINHASH_SIG_CTE},
bands AS (
    SELECT doc_id, j,
           sig[4*j+1] AS k1, sig[4*j+2] AS k2,
           sig[4*j+3] AS k3, sig[4*j+4] AS k4
    FROM sig, generate_series(0, {NUM_BANDS - 1}) g(j)
), cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.j = b.j AND a.k1 = b.k1 AND a.k2 = b.k2
     AND a.k3 = b.k3 AND a.k4 = b.k4 AND a.doc_id < b.doc_id
), est AS (
    SELECT c.doc_a, c.doc_b,
        round(CAST(len([i for i in generate_series(1, {NUM_PERM})
                        if sa.sig[i] = sb.sig[i]]) AS DOUBLE) / {NUM_PERM},
              6) AS est_jaccard
    FROM cand c
    JOIN sig sa ON sa.doc_id = c.doc_a
    JOIN sig sb ON sb.doc_id = c.doc_b
)
SELECT doc_a, doc_b, est_jaccard FROM est
WHERE est_jaccard >= {JACCARD_THRESHOLD}
"""

_SIMHASH_BIT_TERMS = " + ".join(
    f"(CASE WHEN v[{b + 1}] > 0 THEN {1 << b} ELSE 0 END)" for b in range(64)
)

def simhash_sig_cte(key: str) -> str:
    """The SimHash signature CTE chain keyed by ``key`` (one or more comma-
    separated columns), consuming a ``toks(key..., t)`` CTE — the SQL twin
    of ``raycdc.phash.simhash64``. Emits ``sig(key..., simhash BIGINT)``."""
    return f"""
th AS (
    SELECT {key}, list_transform(t, x -> {H.sql_poly('x')}) AS h FROM toks
), votes AS (
    SELECT {key},
        [COALESCE(list_sum(list_transform(h, hv ->
            CASE WHEN ((p[1]*hv + p[2]) % {H.P}) % 2 = 1 THEN 1 ELSE -1 END)
         ), 0)
         for p in {H.sql_pairs(H.SIMHASH_A, H.SIMHASH_C)}] AS v
    FROM th
), sig AS (
    SELECT {key},
        CAST(CASE WHEN s >= 9223372036854775808
                  THEN s - 18446744073709551616 ELSE s END AS BIGINT)
            AS simhash
    FROM (SELECT {key}, {_SIMHASH_BIT_TERMS} AS s FROM votes)
)"""


_SIMHASH_SIG_CTE = simhash_sig_cte("doc_id")

SIMHASH_GROUPS_SQL = f"""
WITH {_TOKS_CTE}, {_SIMHASH_SIG_CTE}
SELECT simhash, count(*) AS n_docs, min(doc_id) AS canonical_doc
FROM sig GROUP BY simhash
"""

SIMHASH_HAMMING_SQL = f"""
WITH {_TOKS_CTE}, {_SIMHASH_SIG_CTE}
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {HAMMING_K}
"""

NGRAM_JACCARD_SQL = f"""
WITH toks AS (
    SELECT doc_id, CAST(doc_id // 2 AS BIGINT) AS pair_key,
           {T.toks_sql('text')} AS t
    FROM documents
), tris AS (
    SELECT doc_id, pair_key,
        CASE WHEN len(t) = 0 THEN ['']
             WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
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

# -- FastSS edit-distance dedup ------------------------------------------------
#
# Deletion-neighborhood LSH for levenshtein distance ≤ 1 over normalized
# 32-char prefixes: two strings are within one edit iff their deletion
# neighborhoods {s} ∪ {delete(s, d)} intersect, so candidate generation is
# "share a variant-string hash" — the same banded-bucket shape as MinHash,
# and it reuses the whole no-gather machinery above (occupancy scan over
# 8 B/row keys, broadcast hot set, bounded-partition segmented verify).

_LEV_PREFIX = 32
_FNV = np.uint64(1099511628211)
_LEV_POW = np.empty(_LEV_PREFIX + 1, dtype=np.uint64)
_LEV_POW[0] = np.uint64(1)
with np.errstate(over="ignore"):  # uint64 wrap is the hash arithmetic
    for _i in range(1, _LEV_PREFIX + 1):
        _LEV_POW[_i] = _LEV_POW[_i - 1] * _FNV


def _prefix_matrix(texts: np.ndarray):
    """(n, 32) uint8 char matrix + per-row true lengths for lowercased
    32-char prefixes — one vectorized fixed-width encode, no per-row
    Python."""
    low = pd.Series(texts).str.lower()
    lens = low.str.len().clip(upper=_LEV_PREFIX).to_numpy().astype("int64")
    fixed = np.asarray(low.to_numpy(), dtype=f"S{_LEV_PREFIX}")
    mat = fixed.view("uint8").reshape(len(lens), _LEV_PREFIX)
    return mat, lens


def _deletion_keys(mat: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """(n, 33) int64 bucket keys: column 0 is the string itself, column
    1+d the deletion at position d (invalid d ≥ len → sentinel that never
    collides). Variant-string hashes are EXACT rolling hashes — delete(u, i)
    == delete(v, j) as strings ⟹ equal keys — computed from prefix/suffix
    hash arrays with one vectorized pass per column (32 column steps, each
    O(n)):  H(del d) = pre[d] · B^(L-2-d+1) + suf[d+1]."""
    n, W = mat.shape
    c = mat.astype(np.uint64)
    pre = np.zeros((n, W + 1), dtype=np.uint64)   # pre[:, d] = hash of s[:d]
    for d in range(W):
        pre[:, d + 1] = pre[:, d] * _FNV + c[:, d]
    suf = np.zeros((n, W + 1), dtype=np.uint64)   # suf[:, j] = Σ_{i≥j} c_i·B^(L-1-i)
    expo = lens[:, None] - 1 - np.arange(W)[None, :]
    pw = _LEV_POW[np.clip(expo, 0, _LEV_PREFIX)]
    pw[expo < 0] = np.uint64(0)                   # padding columns contribute 0
    term = c * pw
    suf[:, :W] = term[:, ::-1].cumsum(axis=1, dtype=np.uint64)[:, ::-1]

    keys = np.empty((n, W + 1), dtype=np.uint64)
    gold = np.uint64(0x9E3779B97F4A7C15)
    # column 0: the undeleted string (hash pre[L], length L)
    keys[:, 0] = pre[np.arange(n), lens] + lens.astype(np.uint64) * gold
    d_idx = np.arange(W)[None, :]
    shift = np.clip(lens[:, None] - 1 - d_idx, 0, _LEV_PREFIX)
    hv = pre[:, :W] * _LEV_POW[shift] + suf[:, 1:]
    keys[:, 1:] = hv + (lens[:, None] - 1).astype(np.uint64) * gold
    # deletions past the string's end are not real variants: poison with a
    # per-(row, col) unique sentinel so they can never collide
    bad = d_idx >= lens[:, None]
    row_salt = np.arange(n, dtype=np.uint64)[:, None] * np.uint64(0xDEADBEEF97F4A7C5)
    keys[:, 1:][bad] = (
        np.uint64(0x8000000000000000)
        + row_salt.repeat(W, axis=1)[bad]
        + d_idx.astype(np.uint64).repeat(n, axis=0).reshape(n, W)[bad]
    )
    return keys.view(np.int64)


def _lev_le1_pairs(a_mat, a_len, b_mat, b_len) -> np.ndarray:
    """Exact levenshtein for pair arrays where distance ≤ 1 is possible:
    returns dist (0, 1, or 2 meaning '>1'), fully vectorized. Same length:
    dist = hamming (if ≤ 1). Length diff 1: dist 1 iff common-prefix +
    common-suffix covers the shorter string."""
    n = len(a_len)
    dist = np.full(n, 2, dtype=np.int64)
    diff = a_len - b_len
    eqm = a_mat == b_mat
    same = diff == 0
    if same.any():
        # hamming over the true length only (padding bytes both 0 → equal)
        ham = (~eqm[same]).sum(axis=1)
        d = np.where(ham <= 1, ham, 2)
        dist[same] = d
    for sgn in (1, -1):  # a longer / b longer
        m = diff == sgn
        if not m.any():
            continue
        lng_m, lng_l = (a_mat[m], a_len[m]) if sgn == 1 else (b_mat[m], b_len[m])
        sht_m, sht_l = (b_mat[m], b_len[m]) if sgn == 1 else (a_mat[m], a_len[m])
        W = lng_m.shape[1]
        cols = np.arange(W)[None, :]
        # lcp: first column where they differ (padding equal → cap at sht_l)
        neq = lng_m != sht_m
        lcp = np.where(neq.any(axis=1), neq.argmax(axis=1), W)
        lcp = np.minimum(lcp, sht_l)
        # lcs: align ends — compare lng[i + 1] with sht[i] from the right
        sh_neq = lng_m[:, 1:] != sht_m[:, :-1]
        pos_ok = cols[:, : W - 1] < sht_l[:, None]  # only true chars count
        bad = sh_neq & pos_ok
        # common suffix length = sht_l - 1 - (last bad index), or sht_l if none
        rev_bad = bad[:, ::-1]
        last_bad = np.where(
            bad.any(axis=1), (W - 2) - rev_bad.argmax(axis=1), -1
        )
        lcs = sht_l - 1 - last_bad
        lcs = np.minimum(lcs, sht_l)
        dist[m] = np.where(lcp + lcs >= sht_l, 1, 2)
    return dist


class BucketLevPairs:
    """Exact edit-distance verification of one deletion-neighborhood
    bucket: all docs here share a variant string, so every pair is a
    candidate; the vectorized DP-free ≤1 check decides."""

    def __call__(self, g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"doc_a": pd.Series(dtype="int64"), "doc_b": pd.Series(dtype="int64"),
             "dist": pd.Series(dtype="int64")}
        )
        if len(g) < 2:
            return empty
        g = g.drop_duplicates("doc_id").sort_values("doc_id")
        if len(g) < 2:
            return empty
        mat, lens = _prefix_matrix(g["prefix"].to_numpy())
        ids = g["doc_id"].to_numpy()
        ii, jj = np.triu_indices(len(ids), k=1)
        dist = _lev_le1_pairs(mat[ii], lens[ii], mat[jj], lens[jj])
        ok = dist <= 1
        return pd.DataFrame(
            {"doc_a": ids[ii[ok]], "doc_b": ids[jj[ok]], "dist": dist[ok]}
        )


def dedup_levenshtein_pairs(sf_dir: str):
    """Near-dup pairs with edit distance ≤ 1 on normalized 32-char
    prefixes, FastSS-style — the same no-gather LSH pipeline as
    ``dedup_minhash_pairs`` with the deletion neighborhood as the banding
    function: (1) every doc emits 33 variant-hash keys (8 B each, exact
    rolling hashes — one vectorized pass per column); (2) bucket occupancy
    via the distributed sorted scan; (3) the tiny hot set broadcasts and
    prunes candidates at the map side; (4) exact ≤1 verification runs on
    bounded hash partitions. Output is EXACT (verify decides), which is
    what lets plain ``levenshtein()`` SQL be the oracle."""
    import ray

    docs = C.read(sf_dir, "documents", ["doc_id", "text"]).materialize()

    def variant_keys(b: pd.DataFrame):
        import pyarrow as pa

        mat, lens = _prefix_matrix(b["text"].to_numpy())
        return pa.table(
            {"bucket": pa.array(_deletion_keys(mat, lens).reshape(-1), pa.int64())}
        )

    hot = _collided_buckets(docs.map_batches(variant_keys, batch_format="pandas"))
    empty = pd.DataFrame(
        {"doc_a": pd.Series(dtype="int64"), "doc_b": pd.Series(dtype="int64"),
         "dist": pd.Series(dtype="int64")}
    )
    if not len(hot):
        return empty
    hot_ref = ray.put(hot)

    def hot_rows(b: pd.DataFrame) -> pd.DataFrame:
        hot_arr = ray.get(hot_ref)
        if not len(b):
            return pd.DataFrame(
                {"bucket": pd.Series(dtype="int64"),
                 "doc_id": pd.Series(dtype="int64"),
                 "prefix": pd.Series(dtype="object")}
            )
        mat, lens = _prefix_matrix(b["text"].to_numpy())
        keys = _deletion_keys(mat, lens)
        nv = keys.shape[1]
        prefix = pd.Series(b["text"].to_numpy()).str.lower().str.slice(0, _LEV_PREFIX)
        out = pd.DataFrame(
            {
                "bucket": keys.reshape(-1),
                "doc_id": np.repeat(b["doc_id"].to_numpy(), nv),
                "prefix": np.repeat(prefix.to_numpy(), nv),
            }
        )
        return out[np.isin(out["bucket"].to_numpy(), hot_arr)]

    cand = docs.map_batches(hot_rows, batch_format="pandas")
    pairs = C.by_partition(cand, "bucket", _segmented_verify(BucketLevPairs()))
    out = pairs.to_pandas()
    if not len(out):
        return empty
    return (
        out.drop_duplicates(["doc_a", "doc_b"])
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
        .astype({"doc_a": "int64", "doc_b": "int64", "dist": "int64"})
    )


LEVENSHTEIN_PAIRS_SQL = f"""
WITH d AS (
    SELECT doc_id, substr(lower(text), 1, {_LEV_PREFIX}) AS p FROM documents
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       levenshtein(a.p, b.p) AS dist
FROM d a JOIN d b
  ON a.doc_id < b.doc_id AND levenshtein(a.p, b.p) <= 1
"""


# -- exact set-similarity join via prefix filtering (AllPairs/PPJoin) -------

# Jaccard threshold as an exact rational so both sides test integers
PJ_NUM, PJ_DEN = 1, 2


def _pj_prefix_len(m: np.ndarray) -> np.ndarray:
    """AllPairs prefix length m − ⌈T·m⌉ + 1 with integer ceil of the
    rational threshold (no float boundary anywhere)."""
    return m - (PJ_NUM * m + PJ_DEN - 1) // PJ_DEN + 1


def dedup_prefix_jaccard(sf_dir: str):
    """EXACT all-pairs trigram-set Jaccard join (≥ 1/2) via df-ordered
    prefix filtering — the AllPairs/PPJoin family (Bayardo et al. WWW'07,
    Xiao et al. WWW'08): two records can reach the threshold only if they
    share a token among the FIRST ``m − ⌈T·m⌉ + 1`` of their tokens in
    ascending-document-frequency order, so candidate generation touches
    only the rarest slice of each record and is exact — no false
    negatives, unlike the MinHash/SimHash paths. Complements them as the
    dedup family's exactness anchor (reference analog: the exact-dup
    delete+rewrite, ``indexer/exporters/postgres_item_exporter.py``).

    Scale shape, three bounded passes:
      1. df pass over DISTINCT trigrams (per-batch partials → int groupby),
         keeping ONLY df ≥ 2 — a df-1 trigram can't co-occur, and absent
         keys order as (df=1, tok) — so the broadcast order map is
         O(shared content), never O(vocab);
      2. prefix pass: per doc, distinct trigrams sort by (df, tok) — a
         total order both sides replicate exactly — and only prefix
         tokens with df ≥ 2 emit (tok, doc, m) rows; candidates pair up
         inside per-token bounded partitions (prefix tokens are the
         RAREST of each doc, so buckets are df-bounded and tiny by
         construction);
      3. verify: candidate docs re-read KEY-PRUNED, exploded to
         (pair, doc) rows, exact intersection counted per pair inside
         bounded partitions with the integer cross-multiplied threshold
         test (PJ_DEN·i ≥ PJ_NUM·(mₐ+m_b−i)).
    Driver materializations: the candidate pair list (O(candidates),
    prefix-filtered) — the same contract as dedup_minhash_pairs."""
    import pyarrow.dataset as pads
    import ray

    docs = C.read(sf_dir, "documents", ["doc_id", "text"])

    def tri_rows(b: pd.DataFrame) -> pd.DataFrame:
        """(doc_id, distinct trigram) rows; token-less docs drop (an empty
        set is similar to nothing under this operator's contract)."""
        texts = b["text"].to_numpy()
        ids = b["doc_id"].to_numpy()
        tris: list = []
        bounds = [0]
        keep = []
        for i, t in enumerate(texts):
            s = _shingle_strings(t)
            if s == [""]:
                continue
            keep.append(i)
            tris.extend(set(s))
            bounds.append(len(tris))
        counts = np.diff(bounds)
        return pd.DataFrame(
            {
                "doc_id": np.repeat(ids[keep], counts).astype(np.int64),
                "tok": np.array(tris, dtype=object),
            }
        )

    # NOT materialized: both consumers (df pass, prefix pass) recompute the
    # explosion from the pruned read — re-shingling is cheap vectorized CPU,
    # pinning the exploded corpus (~3× text bytes) in the object store is not
    tri = docs.map_batches(tri_rows, batch_format="pandas")

    def df_partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("tok", as_index=False).size()
        return pd.DataFrame({"tok": g["tok"], "n": g["size"].astype("int64")})

    # trigram keys are near-unique → fold df per bounded partition and keep
    # ONLY df≥2 rows inside the kernel (the native hash aggregate would
    # shuffle O(vocab) string keys; this ships O(shared content))
    def df_fold(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("tok", as_index=False)["n"].sum()
        return s[s["n"] >= 2]

    shared = C.by_partition(
        tri.map_batches(df_partial, batch_format="pandas"), "tok", df_fold
    ).to_pandas()
    df_map = dict(zip(shared["tok"], shared["n"].astype(int)))
    dref = ray.put(df_map)

    def prefix_rows(b: pd.DataFrame) -> pd.DataFrame:
        """Per doc: sort distinct trigrams by (df, tok), emit df≥2 prefix
        tokens. Vectorized: one lexsort over the batch's exploded rows
        with doc as the major key, then a per-doc positional mask."""
        dmap = ray.get(dref)
        if not len(b):
            return pd.DataFrame(
                {"tok": pd.Series(dtype=object),
                 "doc_id": pd.Series(dtype="int64"),
                 "m": pd.Series(dtype="int64"),
                 "pos": pd.Series(dtype="int64")}
            )
        dfv = b["tok"].map(dmap).fillna(1).to_numpy(np.int64)
        order = np.lexsort(
            (b["tok"].to_numpy(dtype=object), dfv, b["doc_id"].to_numpy())
        )
        d = b["doc_id"].to_numpy()[order]
        tok = b["tok"].to_numpy(dtype=object)[order]
        dfo = dfv[order]
        # per-doc sizes and positions within the doc's sorted token run
        _, starts, m = np.unique(d, return_index=True, return_counts=True)
        pos = np.arange(len(d)) - np.repeat(starts, m)
        plen = _pj_prefix_len(np.repeat(m, m))
        sel = (pos < plen) & (dfo >= 2)
        return pd.DataFrame(
            {
                "tok": tok[sel],
                "doc_id": d[sel].astype(np.int64),
                "m": np.repeat(m, m)[sel].astype(np.int64),
                "pos": pos[sel].astype(np.int64),
            }
        )

    pref = tri.map_batches(prefix_rows, batch_format="pandas")

    def token_pairs(g: pd.DataFrame) -> pd.DataFrame:
        """Candidate pairs within each token's bucket (doc-sorted triu);
        buckets are df-bounded (prefix tokens are rare by construction).
        Vectorized by the size-bucketed triu expansion (one
        ``np.triu_indices`` per DISTINCT bucket size, never a Python loop
        over the near-unique token key — the graph_cosupply_pairs
        kernel)."""
        empty = pd.DataFrame(
            {"doc_a": pd.Series(dtype="int64"),
             "doc_b": pd.Series(dtype="int64")}
        )
        if len(g) == 0:
            return empty
        g = g.sort_values(["tok", "doc_id"], kind="stable")
        toks = g["tok"].to_numpy(dtype=object)
        ids = g["doc_id"].to_numpy(np.int64)
        new = np.ones(len(g), bool)
        new[1:] = toks[1:] != toks[:-1]
        starts = np.flatnonzero(new)
        sizes = np.diff(np.append(starts, len(g)))
        outs = []
        for s in np.unique(sizes):
            if s < 2:
                continue
            gs = starts[sizes == s]
            ia, ib = np.triu_indices(int(s), k=1)
            outs.append(
                pd.DataFrame(
                    {
                        "doc_a": ids[(gs[:, None] + ia[None, :]).ravel()],
                        "doc_b": ids[(gs[:, None] + ib[None, :]).ravel()],
                    }
                )
            )
        if not outs:
            return empty
        return pd.concat(outs, ignore_index=True).drop_duplicates()

    cand = (
        C.by_partition(pref, "tok", token_pairs)
        .to_pandas()
        .drop_duplicates(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    if len(cand) == 0:
        return pd.DataFrame(
            {"doc_a": pd.Series(dtype="int64"),
             "doc_b": pd.Series(dtype="int64"),
             "jaccard": pd.Series(dtype="float64")}
        )

    cand["pair_id"] = np.arange(len(cand), dtype=np.int64)
    pair_of: dict = {}
    for pid, a, bdoc in zip(cand["pair_id"], cand["doc_a"], cand["doc_b"]):
        pair_of.setdefault(int(a), []).append(int(pid))
        pair_of.setdefault(int(bdoc), []).append(int(pid))
    pref_map = ray.put({k: np.asarray(v, np.int64) for k, v in pair_of.items()})
    doc_ids = sorted(pair_of)

    cdocs = C.read(
        sf_dir, "documents", ["doc_id", "text"],
        filter=pads.field("doc_id").isin(doc_ids),
    )

    def to_pair_rows(b: pd.DataFrame) -> pd.DataFrame:
        pm = ray.get(pref_map)
        ids = b["doc_id"].to_numpy(np.int64)
        texts = b["text"].to_numpy()
        reps = [pm.get(int(i), np.empty(0, np.int64)) for i in ids]
        counts = np.array([len(r) for r in reps], np.int64)
        return pd.DataFrame(
            {
                "pair_id": (
                    np.concatenate(reps) if len(reps) else np.empty(0, np.int64)
                ),
                "doc_id": np.repeat(ids, counts),
                "text": np.repeat(texts, counts),
            }
        )

    rows = cdocs.map_batches(to_pair_rows, batch_format="pandas")

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"pair_id": pd.Series(dtype="int64"),
             "jaccard": pd.Series(dtype="float64")}
        )
        g = g[g.groupby("pair_id")["doc_id"].transform("size") == 2]
        if len(g) == 0:
            return empty
        texts = g["text"].to_numpy()
        tris: list = []
        bounds = [0]
        for t in texts:
            tris.extend(set(_shingle_strings(t)))
            bounds.append(len(tris))
        counts = np.diff(bounds)
        ex = pd.DataFrame(
            {
                "pair_id": np.repeat(g["pair_id"].to_numpy(np.int64), counts),
                "tri": tris,
            }
        )
        per = ex.groupby(["pair_id", "tri"], sort=False).size()
        stats = per.groupby(level=0).agg(["size", "sum"])
        union = stats["size"].to_numpy(np.int64)
        inter = (stats["sum"].to_numpy(np.int64) - union)  # docs-per-tri − 1
        ok = PJ_DEN * inter >= PJ_NUM * union
        pid = stats.index.to_numpy(np.int64)[ok]
        # doc_a/doc_b resolve on the driver from the candidate table
        return pd.DataFrame(
            {
                "pair_id": pid,
                "jaccard": np.round(
                    inter[ok] / union[ok], 4
                ).astype(np.float64),
            }
        )

    ver = C.by_partition(rows, "pair_id", verify).to_pandas()
    out = cand.merge(ver, on="pair_id")[["doc_a", "doc_b", "jaccard"]]
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def _prefix_jaccard_sql() -> str:
    """Oracle = the DIRECT exact join (token equi-join over distinct
    trigram sets + integer threshold), no prefix filter — independently
    validating the filter's no-false-negative guarantee."""
    return f"""
WITH {_TOKS_CTE},
sh AS (
    SELECT doc_id,
        CASE WHEN len(t) < {SHINGLE_W} THEN [array_to_string(t, ' ')]
             ELSE [t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                   for i in generate_series(1, len(t) - 2)]
        END AS s
    FROM toks WHERE len(t) > 0
),
tri AS (SELECT doc_id, unnest(list_distinct(s)) AS tok FROM sh),
m AS (SELECT doc_id, count(*) AS m FROM tri GROUP BY 1),
inter AS (
    SELECT x.doc_id AS da, y.doc_id AS db, count(*) AS i
    FROM tri x JOIN tri y ON x.tok = y.tok AND x.doc_id < y.doc_id
    GROUP BY 1, 2
)
SELECT da AS doc_a, db AS doc_b,
       round(CAST(i AS DOUBLE) / (a.m + b.m - i), 4) AS jaccard
FROM inter JOIN m a ON a.doc_id = da JOIN m b ON b.doc_id = db
WHERE {PJ_DEN} * i >= {PJ_NUM} * (a.m + b.m - i)
ORDER BY doc_a, doc_b
"""


QUERIES = {
    "dedup_prefix_jaccard": dedup_prefix_jaccard,
    "dedup_minhash_pairs": dedup_minhash_pairs,
    "dedup_levenshtein_pairs": dedup_levenshtein_pairs,
    "dedup_simhash": dedup_simhash,
    "dedup_simhash_hamming": dedup_simhash_hamming,
    "ngram_jaccard_pairs": ngram_jaccard_pairs,
}

ORACLE_SQL = {
    "dedup_prefix_jaccard": _prefix_jaccard_sql(),
    "dedup_minhash_pairs": MINHASH_PAIRS_SQL,
    "dedup_levenshtein_pairs": LEVENSHTEIN_PAIRS_SQL,
    "dedup_simhash": SIMHASH_GROUPS_SQL,
    "dedup_simhash_hamming": SIMHASH_HAMMING_SQL,
    "ngram_jaccard_pairs": NGRAM_JACCARD_SQL,
}
