"""Corpus-scrubbing operators: configurable-pattern redaction (the PII
scrub stage) and Gopher-style repetition metrics (duplicate-n-gram quality
signals) — the content-hygiene half of a training-data pipeline, next to
the dedup family.

Reference analog: the scrub stage plays the role of the reference's
per-record sanitizing extractors (`indexer/domain/log.py` topic/data
normalization — every raw payload passes a cleaning map before export);
repetition metrics extend the quality-scorer family (`docs.QualityScorer`).

Both are pure ``map_batches`` projections — embarrassingly parallel, no
shuffle at any scale — and both are DuckDB-oracle-verified: redaction uses
RE2 regexes (pyarrow.compute and DuckDB share the RE2 engine, so
replacement semantics match exactly); repetition counts n-gram duplicates
through the portable poly-hash family so both sides see identical
collisions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from raycdc import textkit as T
from raycdc.queries import common as C

# -- configurable-pattern redaction (PII scrub) ------------------------------

# Ordered (name, RE2 pattern) list. Email/IPv4 are the standard PII
# drop-ins (no hits in the synthetic corpus — they document the real-world
# config); the agent-token rule matches this corpus so the operator's
# replace path is exercised end to end. Patterns apply IN ORDER, each
# counting its hits on the text state left by the previous one.
REDACT_PATTERNS: list[tuple[str, str]] = [
    ("email", r"[\w.+-]+@[\w-]+\.[\w.]+"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
    ("agent_token", r"\b\w+er\b"),
]
REDACT_TOKEN = "<redacted>"

# the pattern list is documented as configurable and gets interpolated into
# single-quoted SQL literals (_redact_sql); a quote would break — or inject
# into — the oracle SQL, so reject it at import
for _name, _pat in REDACT_PATTERNS:
    if "'" in _pat:
        raise ValueError(
            f"REDACT_PATTERNS[{_name!r}] contains a single quote; "
            "escape it or rewrite the pattern (oracle SQL interpolation)"
        )


def docs_redact(sf_dir: str):
    """Redact every match of the configured pattern list, reporting the
    per-doc redaction count. Arrow-native: ``count_substring_regex`` +
    ``replace_substring_regex`` per pattern on the zero-copy batch — one C
    pass per pattern, no Python per row."""
    ds = C.read(sf_dir, "documents", ["doc_id", "text"])

    def scrub(t: pa.Table) -> pa.Table:
        txt = t.column("text")
        total = pa.array(np.zeros(t.num_rows, np.int64))
        for _, pat in REDACT_PATTERNS:
            total = pc.add(total, pc.cast(
                pc.count_substring_regex(txt, pat), pa.int64()))
            txt = pc.replace_substring_regex(txt, pat, REDACT_TOKEN)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "clean_text": txt,
                "n_redacted": total,
            }
        )

    return ds.map_batches(scrub, batch_format="pyarrow")


def _redact_sql() -> str:
    txt = "text"
    counts = []
    for _, pat in REDACT_PATTERNS:
        p = pat.replace("'", "''")  # defense in depth (also import-checked)
        counts.append(f"len(regexp_extract_all({txt}, '{p}'))")
        txt = f"regexp_replace({txt}, '{p}', '{REDACT_TOKEN}', 'g')"
    return f"""
SELECT doc_id, {txt} AS clean_text,
       CAST({' + '.join(counts)} AS BIGINT) AS n_redacted
FROM documents
"""


# -- canonical text normalization ---------------------------------------------
#
# the standard pre-dedup/pre-tokenize cleanup pass (C4/RefinedWeb style):
# lowercase → non-alphanumerics to spaces → collapse runs → trim. Every
# regex runs on RE2 in BOTH engines (Arrow replace_substring_regex and
# DuckDB regexp_replace share it), so replacement semantics match exactly
# — the same guarantee docs_redact leans on.


def docs_normalize(sf_dir: str):
    """Canonically normalized text + its token count per doc: pure
    zero-copy Arrow ``map_batches`` (three C regex/kernel passes per
    batch, no shuffle, no Python per row)."""
    ds = C.read(sf_dir, "documents", ["doc_id", "text"])

    def norm(t: pa.Table) -> pa.Table:
        txt = pc.utf8_lower(t.column("text"))
        txt = pc.replace_substring_regex(txt, r"[^a-z0-9 ]", " ")
        txt = pc.replace_substring_regex(txt, r" +", " ")
        txt = pc.utf8_trim(txt, " ")
        n = pc.utf8_length(txt)
        spaces = pc.subtract(
            n, pc.utf8_length(pc.replace_substring(txt, " ", ""))
        )
        n_tokens = pc.if_else(
            pc.equal(n, 0),
            pa.scalar(0, pa.int64()),
            pc.cast(pc.add(spaces, 1), pa.int64()),
        )
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "norm_text": txt,
                "n_tokens": n_tokens,
            }
        )

    return ds.map_batches(norm, batch_format="pyarrow")


NORMALIZE_SQL = """
WITH n AS (
    SELECT doc_id,
           trim(regexp_replace(regexp_replace(lower(text),
                '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'), ' ') AS norm_text
    FROM documents
)
SELECT doc_id, norm_text,
       CAST(CASE WHEN norm_text = '' THEN 0
            ELSE length(norm_text)
                 - length(replace(norm_text, ' ', '')) + 1 END AS BIGINT)
           AS n_tokens
FROM n
"""


# -- Gopher-style repetition metrics -----------------------------------------

REP_N = 2  # duplicate-n-gram window (Gopher uses 2..4-gram dup fractions)


def docs_repetition(sf_dir: str):
    """Per-doc repetition quality signals (the Gopher/C4 rules): total
    2-grams, duplicate 2-gram occurrences (beyond each gram's first),
    the duplicate fraction, and adjacent-token repeats ("batch batch").

    Scale shape: a doc is one row, so every metric is batch-local — pure
    ``map_batches``, zero shuffle. The kernel is the corpus-wide vectorized
    n-gram pass (one explode, N-1 object-array concats, one poly-hash
    matrix pass), then per-doc distinct counting via ONE lexsort + boundary
    scan over the whole batch — no per-doc Python. Gram identity goes
    through the portable poly-hash so the DuckDB oracle counts the same
    duplicates (identical collisions included)."""
    from raycdc import phash as H

    ds = C.read(sf_dir, "documents", ["doc_id", "text"])

    def metrics(b: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "doc_id": b["doc_id"].astype("int64").to_numpy(),
                "n_grams": np.zeros(len(b), np.int64),
                "n_dup_grams": np.zeros(len(b), np.int64),
                "frac_dup": np.zeros(len(b), np.float64),
                "n_adjacent_repeats": np.zeros(len(b), np.int64),
            }
        )
        lists = T.token_lists(b["text"])
        keep = lists.str.len() > 0
        if not keep.any():
            return out
        d = pd.DataFrame(
            {
                "doc_id": b.loc[keep, "doc_id"].astype("int64").to_numpy(),
                "tok": lists[keep].to_numpy(),
            }
        )
        e = d.explode("tok", ignore_index=True)
        arr = e["tok"].to_numpy(dtype=object)
        did = e["doc_id"].to_numpy()
        n = len(arr)
        if n < REP_N:
            return out
        g = arr[: n - REP_N + 1].copy()
        for j in range(1, REP_N):
            g = g + " "
            g = g + arr[j : n - REP_N + 1 + j]
        valid = did[: n - REP_N + 1] == did[REP_N - 1 :]
        gdoc = did[: n - REP_N + 1][valid]
        gh = H.poly_hash(g[valid])
        adj = (
            (arr[: n - 1] == arr[1:]) & (did[: n - 1] == did[1:])
        )
        # per-doc totals + distincts: one lexsort over the whole batch
        order = np.lexsort((gh, gdoc))
        sd, sh = gdoc[order], gh[order]
        first = np.ones(len(sd), bool)
        first[1:] = (sd[1:] != sd[:-1]) | (sh[1:] != sh[:-1])
        docs_u, tot = np.unique(sd, return_counts=True)
        _, dist = np.unique(sd[first], return_counts=True)
        idx = pd.Index(out["doc_id"])
        pos = idx.get_indexer(docs_u)
        out.loc[pos, "n_grams"] = tot
        out.loc[pos, "n_dup_grams"] = tot - dist
        out.loc[pos, "frac_dup"] = np.floor(
            (tot - dist) / tot * 1e6 + 0.5
        ) / 1e6
        adocs, acnt = np.unique(did[: n - 1][adj], return_counts=True)
        out.loc[idx.get_indexer(adocs), "n_adjacent_repeats"] = acnt
        return out

    return ds.map_batches(metrics, batch_format="pandas")


def _repetition_sql() -> str:
    from raycdc import phash as H

    gram_h = H.sql_poly(f"array_to_string(list_slice(w, i, i + {REP_N} - 1), ' ')")
    return rf"""
WITH toks AS (
  SELECT doc_id, w
  FROM (SELECT doc_id, {T.toks_sql('text')} AS w FROM documents)
  WHERE len(w) > 0
), pos AS (
  SELECT doc_id, w, unnest(generate_series(1, len(w) - {REP_N} + 1)) AS i
  FROM toks WHERE len(w) >= {REP_N}
), grams AS (
  SELECT doc_id, {gram_h} AS h,
         CASE WHEN w[i] = w[i + 1] THEN 1 ELSE 0 END AS adj
  FROM pos
), agg AS (
  SELECT doc_id, count(*) AS n_grams,
         count(*) - count(DISTINCT h) AS n_dup,
         sum(adj) AS n_adj
  FROM grams GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(coalesce(a.n_grams, 0) AS BIGINT) AS n_grams,
       CAST(coalesce(a.n_dup, 0) AS BIGINT) AS n_dup_grams,
       CASE WHEN coalesce(a.n_grams, 0) = 0 THEN 0.0
            ELSE floor(CAST(a.n_dup AS DOUBLE) / a.n_grams * 1000000 + 0.5)
                 / 1000000 END AS frac_dup,
       CAST(coalesce(a.n_adj, 0) AS BIGINT) AS n_adjacent_repeats
FROM documents d LEFT JOIN agg a USING (doc_id)
"""


QUERIES = {
    "docs_redact": docs_redact,
    "docs_normalize": docs_normalize,
    "docs_repetition": docs_repetition,
}

ORACLE_SQL = {
    "docs_redact": _redact_sql(),
    "docs_normalize": NORMALIZE_SQL,
    "docs_repetition": _repetition_sql(),
}
