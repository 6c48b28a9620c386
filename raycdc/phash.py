"""Portable string hashing: ONE hash family computable both as vectorized
numpy (the Ray hot path) and as pure ANSI-ish SQL (the DuckDB oracle).

The driver-side correctness gate compares every query against a DuckDB SQL
oracle; hash-derived operators (MinHash/LSH, SimHash, fingerprints, fake
media headers) were previously unverifiable because they used
``pd.util.hash_array`` (siphash — not SQL-expressible). This module swaps
them onto a polynomial-rolling hash over unicode codepoints:

    H(s) = sum_i  code(s[i]) * B^i   (mod P),   P = 2^31-1, B = 1000003

which numpy evaluates as one (codes × powers) % P matrix pass (zero Python
per row) and DuckDB evaluates as a Horner ``list_reduce`` over
``regexp_split_to_array(s, '')``. 31-bit hashes are plenty for shingle /
token signatures (collisions only perturb a MinHash slightly, and BOTH
sides compute the identical collision, so oracle equality is exact).

Derived families (all data-independent constants, embedded in the SQL as
literals):
  * MinHash permutations:  perm_k(h) = (A_k·h + B_k) mod P  (64 perms)
  * SimHash bit hashes:    bit_b(h)  = ((S_k·h + C_k) mod P) & 1 (64 bits)

The reference's equivalent role is the keccak/content hashing scattered
through ``indexer/utils/abi.py`` — here re-chosen for oracle portability.
"""

from __future__ import annotations

import numpy as np

P = 2147483647  # 2^31 - 1 (prime); all hash values fit int32/BIGINT
B = 1000003

_POWS = np.ones(1, dtype=np.uint64)


def pows(n: int) -> np.ndarray:
    """B^i mod P for i < n (cached, grow-only)."""
    global _POWS
    if len(_POWS) < n:
        out = np.empty(n, np.uint64)
        out[: len(_POWS)] = _POWS
        v = int(_POWS[-1])
        for i in range(len(_POWS), n):
            v = (v * B) % P
            out[i] = v
        _POWS = out
    return _POWS[:n]


def poly_hash(strs) -> np.ndarray:
    """Vectorized H(s) for a sequence of strings → uint64 array (< P).

    One fixed-width UCS4 view + one (codes · powers) % P matrix pass —
    no per-row Python. Trailing NUL padding contributes 0 to the sum, so
    fixed-width packing is exact."""
    a = np.asarray(strs, dtype="U")
    n = len(a)
    if n == 0:
        return np.zeros(0, np.uint64)
    width = a.dtype.itemsize // 4
    if width == 0:  # every string empty
        return np.zeros(n, np.uint64)
    codes = (
        np.ascontiguousarray(a).view(np.uint32).reshape(n, width).astype(np.uint64)
    )
    # codepoint < 2^21, power < 2^31 → product < 2^52; row sums stay < 2^64
    # for width < 2^12, so mod per term then a single row-sum mod is exact
    return ((codes * pows(width)[None, :]) % P).sum(axis=1) % P


def sql_poly(expr: str) -> str:
    """The same H(·) over a SQL string expression (DuckDB): Horner fold
    over the reversed codepoint list; '' hashes to 0 like numpy."""
    return (
        f"CASE WHEN length({expr}) = 0 THEN 0 ELSE list_reduce("
        f"list_reverse(list_transform(regexp_split_to_array({expr}, ''), "
        f"c -> CAST(unicode(c) AS BIGINT))), "
        f"(a, c) -> (a * {B} + c) % {P}) END"
    )


def _family(seed: int, k: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, P, size=k).astype(np.uint64)
    c = rng.randint(0, P, size=k).astype(np.uint64)
    return a, c


# data-independent affine families (fixed seeds: part of the format spec)
MINHASH_A, MINHASH_B = _family(1234, 64)
SIMHASH_A, SIMHASH_C = _family(4321, 64)


def sql_pairs(a: np.ndarray, c: np.ndarray) -> str:
    """[[a_0,c_0],...] literal for SQL comprehensions over the family."""
    return "[" + ",".join(f"[{int(x)},{int(y)}]" for x, y in zip(a, c)) + "]"


_SIMHASH_POW2 = np.uint64(1) << np.arange(64, dtype=np.uint64)


def simhash64(texts: np.ndarray) -> np.ndarray:
    """64-bit SimHash over word unigrams for a batch of texts → int64.

    Batch-vectorized: one portable poly hash over every token of the
    batch, 64 affine bit hashes, one segmented ``add.reduceat`` for the
    per-doc bit votes. A sentinel zero row makes ``starts == len(tokens)``
    (trailing empty docs) a valid reduceat index, so signatures are
    independent of batch composition. Empty / token-less docs get the
    canonical zero signature. The SQL twin is
    ``raycdc.queries.neardup.simhash_sig_cte`` (same family, same votes).
    """
    from raycdc import textkit as _T

    toks_per_doc: list = []
    bounds = [0]
    for t in texts:
        # textkit tokenization, NOT str.split(): str.split() honors ALL
        # Unicode whitespace while the SQL twin (and every other kernel)
        # splits on the ASCII class — they diverge on \x0b / NBSP etc.
        toks_per_doc.extend(_T.py_tokens(t))
        bounds.append(len(toks_per_doc))
    n = len(texts)
    if not toks_per_doc:
        return np.zeros(n, np.int64)
    starts = np.asarray(bounds[:-1])
    counts = np.diff(bounds)
    hs = poly_hash(toks_per_doc)
    bits = (
        ((hs[:, None] * SIMHASH_A[None, :] + SIMHASH_C[None, :])
         % np.uint64(P)) & np.uint64(1)
    ).astype(np.int32)
    signed = np.vstack([2 * bits - 1, np.zeros((1, 64), np.int32)])
    votes = np.add.reduceat(signed, starts, axis=0)
    sig = ((votes > 0).astype(np.uint64) * _SIMHASH_POW2[None, :]).sum(
        axis=1, dtype=np.uint64
    )
    sig[counts == 0] = 0
    return sig.view(np.int64)


def window_min_hash(texts: list, w: int, s: int) -> np.ndarray:
    """min over H(window) for fixed-width char windows of size ``w`` at
    stride ``s`` (1-perm winnowing fingerprint). Fully vectorized: one
    strided slice-multiply per window offset (``w`` vector ops total), no
    per-doc Python. ``texts`` must already be capped to the fingerprint
    window (the caller caps; the SQL twin uses the same cap).

    Matches ``sql_window_min`` exactly: a window extending past the end of
    a doc hashes its in-range prefix (trailing padding contributes 0)."""
    n = len(texts)
    if n == 0:
        return np.zeros(0, np.uint64)
    a = np.asarray(texts, dtype="U")
    width = a.dtype.itemsize // 4
    codes = np.zeros((n, max(width, 1) + w), np.uint64)
    if width:
        codes[:, :width] = (
            np.ascontiguousarray(a).view(np.uint32).reshape(n, width)
        )
    L = np.fromiter((len(t) for t in texts), dtype=np.int64, count=n)
    nwin = np.maximum(L - w, 0) // s + 1
    nmax = int(nwin.max())
    # each term is < 2^52 (pows are mod P < 2^51, chars < 2^21), so the
    # un-modded accumulator holds w terms < w·2^52 — w must stay well
    # under 2^12 or the uint64 sum silently wraps before the single mod
    assert w < 4096, "window_min_hash: w too large for single-mod accumulation"
    pw = pows(w)
    h = np.zeros((n, nmax), np.uint64)
    for k in range(w):  # accumulate < w·2^52 — mod once at the end
        h += codes[:, k::s][:, :nmax] * pw[k]
    h %= P
    h[np.arange(nmax)[None, :] >= nwin[:, None]] = np.uint64(1 << 62)
    return h.min(axis=1)


def sql_window_min(texpr: str, w: int, s: int) -> str:
    """SQL twin of ``window_min_hash`` over a (pre-capped) text column."""
    win = sql_poly(f"substr({texpr}, 1 + i*{s}, {w})")
    return (
        f"list_min([{win} for i in generate_series(0, "
        f"GREATEST(CAST(floor((length({texpr}) - {w}) / {s}) AS BIGINT), 0))])"
    )
