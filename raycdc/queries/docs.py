"""Text-analysis operators over the ``documents`` table: exact dedup,
token counting, quality scoring, language ID — the training-data-pipeline
operator set (task brief), built as vectorized / actor-pool map_batches
stages.

Exact dedup mirrors the reference's seen-key dedup
(`indexer/jobs/export_token_balances_job.py:112-147` in /root/reference):
hash-partition by content, keep the first (min doc_id) per group.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Count, Max, Mean, Min, Sum

from raycdc import textkit as T
from raycdc.queries import common as C


# -- exact dedup (hash-partition + per-group first) ------------------------

def dedup_exact(sf_dir: str):
    """Group by exact text, keep the row with min doc_id. The shuffle key
    is ``hash(text) % NPART`` — a BOUNDED partition id, so the per-group
    callable runs once per partition on a vectorized pandas kernel, never
    once per distinct text (Dataset.groupby iterates groups in Python —
    catastrophic on the near-unique text key at corpus scale). The winner
    inside each partition is picked on the full text (collision-safe)."""
    ds = C.read(sf_dir, "documents", ["doc_id", "text", "lang"])
    nparts = C.join_partitions()

    def add_part(t: pa.Table) -> pa.Table:
        h = pd.util.hash_array(t.column("text").to_numpy(zero_copy_only=False))
        return t.append_column(
            "part", pa.array((h % np.uint64(nparts)).astype("int32"))
        )

    def winners(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("text", as_index=False).agg(
            doc_id=("doc_id", "min"), lang=("lang", "min")
        )
        return out[["doc_id", "text", "lang"]]

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(winners, batch_format="pandas")
    )


DEDUP_EXACT_SQL = """
SELECT min(doc_id) AS doc_id, text, min(lang) AS lang
FROM documents GROUP BY text
"""
# (min(lang) is well-defined: rows sharing text in the synthetic corpus are
# full duplicates; for distinct-text rows the group is a single row.)


# -- token counting (whitespace tokenization, BPE-ish splits) --------------

_WORD_RE = re.compile(r"\S+")


def token_counts(sf_dir: str):
    ds = C.read(sf_dir, "documents", ["doc_id", "text"])

    def count(b: pd.DataFrame) -> pd.DataFrame:
        # textkit tokenizer: RE2-\s-identical on both engines (unicode-safe)
        b["n_tokens"] = T.token_counts(b["text"]).astype("int64")
        b["n_chars"] = b["text"].str.len().astype("int64")
        return b[["doc_id", "n_tokens", "n_chars"]]

    return ds.map_batches(count, batch_format="pandas")


TOKEN_COUNTS_SQL = f"""
SELECT doc_id,
       CAST(len({T.toks_sql('text')}) AS BIGINT) AS n_tokens,
       length(text) AS n_chars
FROM documents
"""


# GPT-2-style pre-tokenizer, constrained to constructs RE2 and Python
# `re` agree on exactly: ordered alternation (both engines are
# leftmost-first), greedy classes, NO lookahead (RE2 has none), and the
# explicit ASCII whitespace class everywhere `\s` would diverge
# (textkit's RE2-vs-unicode lesson)
BPE_PAT = (
    r"'s|'t|'re|'ve|'m|'ll|'d"
    r"| ?[A-Za-z]+| ?[0-9]+"
    r"| ?[^\t\n\f\r A-Za-z0-9]+"
    r"|[\t\n\f\r ]+"
)


def token_counts_bpe(sf_dir: str):
    """BPE-ish token counting — the GPT-2 pre-tokenizer split (contractions,
    space-prefixed letter/digit runs, punctuation runs, whitespace runs)
    beside the whitespace counter above; the pair gives the
    tokens-per-word fill-rate signal packing and budget planning use.
    Pure projection map — embarrassingly parallel, one compiled-regex
    ``Series.str.count`` per batch. The ratio is the one division of two
    exact ints (bit-identical cross-engine); token-less docs ratio 0."""
    ds = C.read(sf_dir, "documents", ["doc_id", "text"])

    def count(b: pd.DataFrame) -> pd.DataFrame:
        bpe = b["text"].str.count(BPE_PAT).astype("int64")
        ws = T.token_counts(b["text"]).astype("int64")
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].astype("int64"),
                "n_bpe_tokens": bpe,
                "tokens_per_word": np.where(
                    ws > 0, bpe / ws.astype("float64"), 0.0
                ),
            }
        )

    return ds.map_batches(count, batch_format="pandas")


# single quotes in the pattern must double inside the SQL literal
_BPE_SQL_PAT = BPE_PAT.replace("'", "''")

TOKEN_COUNTS_BPE_SQL = f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{_BPE_SQL_PAT}')) AS BIGINT)
           AS n_bpe_tokens,
       CASE WHEN len({T.toks_sql('text')}) = 0 THEN 0.0
            ELSE len(regexp_extract_all(text, '{_BPE_SQL_PAT}'))
                 / CAST(len({T.toks_sql('text')}) AS DOUBLE)
       END AS tokens_per_word
FROM documents
"""


# -- token-window chunking (training-data 1→N explode) ---------------------

CHUNK_TOKENS = 32


def doc_chunks(sf_dir: str):
    """Fixed-size token-window chunking: each document explodes to
    ``ceil(n_tokens / 32)`` chunk rows with reconstruction metadata
    (doc_id, chunk_idx, n_tokens) — the core 1→N training-data prep
    explode, and the relational analog of the reference's recursive trace
    flatten (nested payload → flat child rows with position metadata,
    ``indexer/domain/trace.py`` flatten + the 1→N log extractors).

    Scale shape: rows are independent (a doc chunks entirely within its
    batch), so this is a pure ``map_batches`` explode — no shuffle. The
    kernel is C-speed pandas end to end: vectorized split → ``explode`` →
    ``cumcount`` for token positions → hash-aggregate join per chunk."""
    ds = C.read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(_chunk_batch, batch_format="pandas")


def _chunk_batch(b: pd.DataFrame) -> pd.DataFrame:
    """(doc_id, text) batch → fixed-size token-window chunk rows."""
    lists = T.token_lists(b["text"])
    keep = lists.str.len() > 0
    empty = pd.DataFrame(
        {
            "doc_id": pd.Series(dtype="int64"),
            "chunk_idx": pd.Series(dtype="int64"),
            "chunk_text": pd.Series(dtype="object"),
            "n_tokens": pd.Series(dtype="int64"),
        }
    )
    if not keep.any():
        return empty
    d = pd.DataFrame(
        {
            "doc_id": b.loc[keep, "doc_id"].to_numpy(),
            "tok": lists[keep].to_numpy(),
        }
    )
    e = d.explode("tok", ignore_index=True)
    e["chunk_idx"] = (
        e.groupby("doc_id").cumcount() // CHUNK_TOKENS
    ).astype("int64")
    g = e.groupby(["doc_id", "chunk_idx"], as_index=False).agg(
        chunk_text=("tok", " ".join), n_tokens=("tok", "size")
    )
    g["n_tokens"] = g["n_tokens"].astype("int64")
    return g[["doc_id", "chunk_idx", "chunk_text", "n_tokens"]]


DOC_CHUNKS_SQL = rf"""
WITH toks AS (
  SELECT doc_id, w
  FROM (SELECT doc_id, {T.toks_sql('text')} AS w FROM documents)
  WHERE len(w) > 0
),
st AS (
  SELECT doc_id, w,
         unnest(generate_series(1, len(w), {CHUNK_TOKENS})) AS s
  FROM toks
)
SELECT doc_id,
       CAST((s - 1) / {CHUNK_TOKENS} AS BIGINT) AS chunk_idx,
       array_to_string(
           list_slice(w, s, least(s + {CHUNK_TOKENS} - 1, len(w))), ' '
       ) AS chunk_text,
       CAST(least(s + {CHUNK_TOKENS} - 1, len(w)) - s + 1 AS BIGINT)
           AS n_tokens
FROM st
"""


# -- composed corpus-prep pipeline -----------------------------------------

PREP_MIN_QUALITY = 0.5


def corpus_prep(sf_dir: str):
    """The full training-corpus prep flow as ONE lazy streaming pipeline —
    quality gate → exact dedup → token-window chunking — demonstrating
    operator composition (each stage is the standalone operator, fused by
    Ray Data's streaming executor with backpressure; only the dedup stage
    shuffles, on bounded text-hash partitions):

        documents → QualityScorer (actor pool, state per actor)
                  → filter quality ≥ 0.5 (vectorized mask, same stage)
                  → exact-dedup winners (bounded-partition hash agg)
                  → 32-token chunk explode (stateless map)
    """

    class PrepFilter(QualityScorer):
        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            keep = (
                super().__call__(b)["quality"].to_numpy() >= PREP_MIN_QUALITY
            )
            return pd.DataFrame(
                {
                    "doc_id": b["doc_id"].to_numpy()[keep],
                    "text": b["text"].to_numpy()[keep],
                }
            )

    kept = C.read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        PrepFilter, batch_format="pandas", concurrency=(1, 4)
    )

    def winners(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("text", as_index=False).agg(doc_id=("doc_id", "min"))
        out["doc_id"] = out["doc_id"].astype("int64")
        return out[["doc_id", "text"]]

    ded = C.by_partition(kept, "text", winners)
    return ded.map_batches(_chunk_batch, batch_format="pandas")


def _corpus_prep_sql() -> str:
    return f"""
WITH q AS ({QUALITY_SQL}),
keep AS (
    SELECT d.doc_id, d.text
    FROM documents d JOIN q ON d.doc_id = q.doc_id
    WHERE q.quality >= {PREP_MIN_QUALITY}
),
ded AS (SELECT min(doc_id) AS doc_id, text FROM keep GROUP BY text),
toks AS (
    SELECT doc_id, w
    FROM (SELECT doc_id, {T.toks_sql('text')} AS w FROM ded)
    WHERE len(w) > 0
),
st AS (
    SELECT doc_id, w,
           unnest(generate_series(1, len(w), {CHUNK_TOKENS})) AS s
    FROM toks
)
SELECT doc_id,
       CAST((s - 1) / {CHUNK_TOKENS} AS BIGINT) AS chunk_idx,
       array_to_string(
           list_slice(w, s, least(s + {CHUNK_TOKENS} - 1, len(w))), ' '
       ) AS chunk_text,
       CAST(least(s + {CHUNK_TOKENS} - 1, len(w)) - s + 1 AS BIGINT)
           AS n_tokens
FROM st
"""


# -- per-language corpus stats --------------------------------------------

def lang_stats(sf_dir: str):
    out = (
        C.read(sf_dir, "documents", ["lang", "n_chars"])
        .groupby("lang")
        .aggregate(
            Count(alias_name="n_docs"),
            Sum("n_chars", alias_name="total_chars"),
            Mean("n_chars", alias_name="avg_chars"),
        )
        .to_pandas()
    )
    return C.round_cols(out, ["avg_chars"])


LANG_STATS_SQL = """
SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars,
       round(avg(n_chars), 4) AS avg_chars
FROM documents GROUP BY lang
"""


# -- quality scoring (stateful actor stage: compiled regexes + stopwords) --

class QualityScorer:
    """Length / punctuation / stopword-ratio quality heuristics. Regexes
    compiled and stopword set built ONCE per actor in __init__ — the
    stateful-stage pattern (`ray_guide` actor pools; reference analog:
    per-worker token cache `indexer/jobs/base_job.py:95,111-113`)."""

    STOPWORDS = frozenset(
        "the a an and or of to in is are was were be been it this that "
        "for on with as at by from".split()
    )

    def __init__(self):
        self.word = re.compile(r"[a-zA-Z']+")
        self.punct = re.compile(r"[^\w\s]")

    @staticmethod
    def _r6(x):
        # explicit half-up to 6 decimals: numpy's round is banker's while
        # SQL round is half-away — on 6-decimal-rounded inputs the
        # composite lands on exact .5e-6 boundaries often enough to break
        # hash-exact oracle comparison; floor(x*1e6+0.5) is identical on
        # both sides
        return np.floor(np.asarray(x, dtype="float64") * 1e6 + 0.5) / 1e6

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        from itertools import chain

        texts = b["text"]
        n_chars = texts.str.len().clip(lower=1)
        words = texts.str.findall(self.word)
        n_words = words.str.len().clip(lower=1)
        punct = texts.str.count(self.punct)
        # vectorized per-word stats: ONE flat token series for the whole
        # batch (C-speed lower/isin/len), segment-summed back per doc —
        # no per-row Python lambdas in the hottest text stage
        counts = words.str.len().to_numpy()
        bounds = np.concatenate(([0], np.cumsum(counts)))
        flat = pd.Series(list(chain.from_iterable(words)), dtype="object")
        is_stop = flat.str.lower().isin(self.STOPWORDS).to_numpy()
        word_lens = flat.str.len().to_numpy()
        stop = C.segment_sum(is_stop.astype("int64"), bounds)
        sum_len = C.segment_sum(word_lens.astype("int64"), bounds)
        mean_word_len = np.where(counts > 0, sum_len / np.maximum(counts, 1), 0.0)
        out = pd.DataFrame(
            {
                "doc_id": b["doc_id"],
                "n_words": words.str.len().astype("int64"),
                "stopword_ratio": self._r6(stop / n_words),
                "punct_ratio": self._r6(punct / n_chars),
                "mean_word_len": self._r6(mean_word_len),
            }
        )
        # composite score in [0,1]: long-enough, punctuation-light, has glue words
        out["quality"] = self._r6(
            0.4 * np.clip(out["n_words"] / 100.0, 0, 1)
            + 0.3 * (1 - np.clip(out["punct_ratio"] * 5, 0, 1))
            + 0.3 * np.clip(out["stopword_ratio"] * 3, 0, 1)
        )
        return out


def quality_scores(sf_dir: str):
    ds = C.read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(QualityScorer, batch_format="pandas", concurrency=(1, 4))


# -- language ID (character n-gram heuristic, stateful actor) --------------

class LangId:
    """N-gram-profile language guesser. Profiles are tiny hand-rolled
    trigram sets per language — deterministic and dependency-free."""

    PROFILES = {
        "en": {" th", "the", "he ", " an", "and", "nd ", " of", "of ", "ing", "ng "},
        "de": {" de", "der", "er ", " un", "und", "nd ", "ich", "ch ", "ein", "in "},
        "fr": {" le", "le ", " de", "de ", "es ", " la", "la ", "ent", "nt ", "que"},
        "es": {" de", "de ", " la", "la ", "os ", " el", "el ", "ión", "ón ", "que"},
    }

    def __init__(self):
        self.profiles = {k: frozenset(v) for k, v in self.PROFILES.items()}

    def _guess(self, text: str):
        t = f" {text.lower()} "
        grams = {t[i : i + 3] for i in range(len(t) - 2)}
        best, score = "unknown", 0
        for lang in sorted(self.profiles):
            s = len(grams & self.profiles[lang])
            if s > score:
                best, score = lang, s
        return best, score

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        guesses = b["text"].map(self._guess)
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"],
                "lang_guess": guesses.str[0],
                "lang_score": guesses.str[1].astype("int64"),
            }
        )


def lang_id(sf_dir: str):
    ds = C.read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(LangId, batch_format="pandas", concurrency=(1, 4))


# -- document fingerprint (rolling-window winnowing hash) ------------------

FP_W, FP_S, FP_CAP = 32, 16, 4096


def fingerprints(sf_dir: str):
    """Winnowing-style fingerprint over the portable poly-hash family
    (raycdc.phash): ``content_hash`` = H(first 4096 chars), and
    ``min_rolling_hash`` = min over H(window) for 32-char windows at
    stride 16 — a 1-perm winnowing sketch. Fully vectorized (one strided
    slice-multiply per window offset, no per-doc Python) and reproduced
    exactly by the DuckDB oracle."""
    from raycdc import phash as H

    ds = C.read(sf_dir, "documents", ["doc_id", "text"])

    def fp(b: pd.DataFrame) -> pd.DataFrame:
        capped = [t[:FP_CAP] for t in b["text"].to_numpy()]
        full = H.poly_hash(capped).astype("int64")
        mins = H.window_min_hash(capped, FP_W, FP_S).astype("int64")
        return pd.DataFrame(
            {"doc_id": b["doc_id"], "content_hash": full, "min_rolling_hash": mins}
        )

    return ds.map_batches(fp, batch_format="pandas")


def _fingerprints_sql() -> str:
    from raycdc import phash as H

    return f"""
WITH c AS (SELECT doc_id, substr(text, 1, {FP_CAP}) AS t FROM documents)
SELECT doc_id, {H.sql_poly('t')} AS content_hash,
       {H.sql_window_min('t', FP_W, FP_S)} AS min_rolling_hash
FROM c
"""


_STOPWORDS_SQL = ",".join(
    f"'{w}'" for w in sorted(QualityScorer.STOPWORDS)
)

QUALITY_SQL = f"""
WITH w AS (
    SELECT doc_id, text,
           regexp_extract_all(text, '[a-zA-Z'']+') AS words,
           GREATEST(len(text), 1) AS n_chars
    FROM documents
), s AS (
    SELECT doc_id,
        CAST(len(words) AS BIGINT) AS n_words,
        GREATEST(len(words), 1) AS n_words1,
        len(list_filter(words,
            x -> list_contains([{_STOPWORDS_SQL}], lower(x)))) AS n_stop,
        len(regexp_extract_all(text, '[^\\w\\s]')) AS n_punct,
        n_chars,
        CASE WHEN len(words) = 0 THEN 0.0
             ELSE list_aggregate(
                 list_transform(words, x -> CAST(len(x) AS DOUBLE)), 'avg')
        END AS mwl
    FROM w
)
SELECT doc_id, n_words,
    floor(CAST(n_stop AS DOUBLE) / n_words1 * 1000000 + 0.5) / 1000000 AS stopword_ratio,
    floor(CAST(n_punct AS DOUBLE) / n_chars * 1000000 + 0.5) / 1000000 AS punct_ratio,
    floor(mwl * 1000000 + 0.5) / 1000000 AS mean_word_len,
    floor((0.4 * LEAST(n_words / 100.0, 1.0)
        + 0.3 * (1 - LEAST(floor(CAST(n_punct AS DOUBLE) / n_chars * 1000000 + 0.5) / 1000000 * 5, 1.0))
        + 0.3 * LEAST(floor(CAST(n_stop AS DOUBLE) / n_words1 * 1000000 + 0.5) / 1000000 * 3, 1.0))
        * 1000000 + 0.5) / 1000000 AS quality
FROM s
"""


def _profile_sql(lang: str) -> str:
    return "[" + ",".join(f"'{g}'" for g in sorted(LangId.PROFILES[lang])) + "]"


LANG_ID_SQL = f"""
WITH g AS (
    SELECT doc_id,
        list_distinct([substr(t, i, 3)
                       for i in generate_series(1, GREATEST(len(t) - 2, 0))]) AS grams
    FROM (SELECT doc_id, ' ' || lower(text) || ' ' AS t FROM documents)
), sc AS (
    SELECT doc_id,
        len(list_intersect(grams, {_profile_sql('de')})) AS s_de,
        len(list_intersect(grams, {_profile_sql('en')})) AS s_en,
        len(list_intersect(grams, {_profile_sql('es')})) AS s_es,
        len(list_intersect(grams, {_profile_sql('fr')})) AS s_fr
    FROM g
)
SELECT doc_id,
    CASE WHEN GREATEST(s_de, s_en, s_es, s_fr) = 0 THEN 'unknown'
         WHEN s_de = GREATEST(s_de, s_en, s_es, s_fr) THEN 'de'
         WHEN s_en = GREATEST(s_de, s_en, s_es, s_fr) THEN 'en'
         WHEN s_es = GREATEST(s_de, s_en, s_es, s_fr) THEN 'es'
         ELSE 'fr' END AS lang_guess,
    CAST(GREATEST(s_de, s_en, s_es, s_fr) AS BIGINT) AS lang_score
FROM sc
"""


def docs_langid_confusion(sf_dir: str):
    """Model-EVALUATION row: the confusion matrix of the n-gram language
    guesser against the corpus's labeled ``lang`` column — (truth lang,
    guessed lang, count, per-truth recall in basis points). The eval
    pattern every classifier stage needs before it gates a corpus;
    integer-exact (``n·10⁴ // row_total`` floor division).

    Scale shape: the stateful guesser actor pool emits per-batch
    (lang, guess) partial counts — a langs² bounded grain — and the
    recall window runs on the tiny driver fold."""
    ds = C.read(sf_dir, "documents", ["doc_id", "text", "lang"])

    class _ConfusionMap(LangId):
        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            guesses = b["text"].map(self._guess)
            out = pd.DataFrame(
                {"lang": b["lang"], "lang_guess": guesses.str[0],
                 "n": np.int64(1)}
            ).groupby(["lang", "lang_guess"], as_index=False)["n"].sum()
            out["n"] = out["n"].astype("int64")
            return out

    fine = (
        ds.map_batches(_ConfusionMap, batch_format="pandas",
                       concurrency=(1, 4))
        .to_pandas()
        .groupby(["lang", "lang_guess"], as_index=False)["n"]
        .sum()
    )
    fine["n"] = fine["n"].astype("int64")
    row_tot = fine.groupby("lang")["n"].transform("sum").to_numpy(np.int64)
    fine["recall_bp"] = (
        fine["n"].to_numpy(np.int64) * 10_000 // row_tot
    ).astype("int64")
    return fine.sort_values(["lang", "lang_guess"], kind="stable").reset_index(
        drop=True
    )


def _langid_confusion_sql() -> str:
    return f"""
WITH li AS ({LANG_ID_SQL}),
j AS (
  SELECT d.lang, li.lang_guess FROM documents d JOIN li USING (doc_id)
), c AS (
  SELECT lang, lang_guess, CAST(count(*) AS BIGINT) AS n
  FROM j GROUP BY 1, 2
)
SELECT lang, lang_guess, n,
       CAST(n * 10000 // sum(n) OVER (PARTITION BY lang) AS BIGINT)
           AS recall_bp
FROM c ORDER BY lang, lang_guess
"""


# -- corpus vocabulary (global term frequencies) ----------------------------

VOCAB_TOP = 50


def vocab_top_terms(sf_dir: str):
    """Corpus vocabulary: global whitespace-token frequencies, top-50 by
    (count DESC, token ASC). Scale shape: each batch pre-aggregates its own
    token counts (C-speed split → explode → value_counts), so the shuffle
    moves one row per (batch, distinct token) — the combiner pattern — and
    the groupby key space is the vocabulary (Zipf-bounded), never the token
    stream. The final sort+head runs on the vocabulary-sized aggregate."""
    ds = C.read(sf_dir, "documents", ["text"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        toks = T.token_lists(b["text"]).explode()
        vc = toks[toks.notna()].value_counts()
        return pd.DataFrame(
            {"token": vc.index.to_numpy(), "n": vc.to_numpy().astype("int64")}
        )

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("token")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    out["n"] = out["n"].astype("int64")
    return (
        out.sort_values(["n", "token"], ascending=[False, True], kind="stable")
        .head(VOCAB_TOP)
        .reset_index(drop=True)
    )


VOCAB_SQL = rf"""
SELECT t.token, count(*) AS n
FROM documents, unnest({T.toks_sql('text')}) AS t(token)
GROUP BY 1
ORDER BY n DESC, t.token
LIMIT {VOCAB_TOP}
"""


# -- TF-IDF top terms per document -------------------------------------------

TFIDF_TOP = 3


def tfidf_top_terms(sf_dir: str):
    """Per-doc top-3 terms by tf-idf. Two passes: (1) document frequencies
    via the same per-batch combiner as ``vocab_top_terms`` (distinct
    (doc, token) inside the batch — each doc lives in one row — then token
    counts; the fold is vocabulary-sized and broadcast), (2) per-batch tf +
    scoring + per-doc top-3, fully C-speed (explode → hash aggregate →
    sorted groupby.head). The score is the RATIONAL ``tf·N/df`` evaluated
    as one int64 product and one IEEE division — bit-identical in numpy and
    DuckDB, so ranking needs no float tolerance; the reported score is
    rounded half-up on both sides."""
    import pyarrow.parquet as pq

    from raycdc.queries.common import ROUND_DIGITS

    n_docs = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows

    ds = C.read(sf_dir, "documents", ["doc_id", "text"])

    def df_partial(b: pd.DataFrame) -> pd.DataFrame:
        toks = T.token_lists(b["text"])
        e = b[["doc_id"]].assign(token=toks).explode("token").dropna()
        vc = e.drop_duplicates().value_counts("token")
        return pd.DataFrame(
            {"token": vc.index.to_numpy(), "df": vc.to_numpy().astype("int64")}
        )

    df_parts = ds.map_batches(df_partial, batch_format="pandas").to_pandas()
    df_map = df_parts.groupby("token")["df"].sum()  # vocabulary-sized

    import ray

    ref = ray.put(df_map)

    class Score:
        def __init__(self):
            self.df = ray.get(ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            toks = T.token_lists(b["text"])
            e = b[["doc_id"]].assign(token=toks).explode("token").dropna()
            tf = e.groupby(["doc_id", "token"], as_index=False).size()
            tf["score"] = (
                tf["size"].to_numpy() * np.int64(n_docs)
            ).astype(np.float64) / self.df.reindex(tf["token"]).to_numpy()
            top = (
                tf.sort_values(
                    ["doc_id", "score", "token"],
                    ascending=[True, False, True],
                    kind="stable",
                )
                .groupby("doc_id", sort=False)
                .head(TFIDF_TOP)
            )
            rnk = top.groupby("doc_id", sort=False).cumcount() + 1
            score = np.floor(top["score"].to_numpy() * 10**ROUND_DIGITS + 0.5) / (
                10**ROUND_DIGITS
            )
            return pd.DataFrame(
                {
                    "doc_id": top["doc_id"].to_numpy(),
                    "rnk": rnk.to_numpy().astype("int64"),
                    "token": top["token"].to_numpy(),
                    "score": score,
                }
            )

    return ds.map_batches(Score, batch_format="pandas", concurrency=(1, 8))


TFIDF_SQL = rf"""
WITH tok AS (
    SELECT doc_id, t.token
    FROM documents, unnest({T.toks_sql('text')}) AS t(token)
), tf AS (
    SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2
), df AS (
    SELECT token, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1
), n AS (SELECT count(*) AS n FROM documents)
SELECT doc_id, CAST(row_number() OVER w AS BIGINT) AS rnk, token,
       floor(CAST(tf.tf * n.n AS DOUBLE) / df.df * {10**4} + 0.5) / {10**4}.0
           AS score
FROM tf JOIN df USING (token), n
WINDOW w AS (PARTITION BY doc_id
             ORDER BY CAST(tf.tf * n.n AS DOUBLE) / df.df DESC, token)
QUALIFY row_number() OVER w <= {TFIDF_TOP}
"""


# -- deterministic stratified sample ----------------------------------------

SAMPLE_PER_STRATUM = 10


def docs_stratified_sample(sf_dir: str):
    """Deterministic stratified downsample: the SAMPLE_PER_STRATUM docs
    with the smallest portable hash H(doc_id) per (lang, source) stratum —
    seedable, order-independent, resumable (the training-data "take N per
    source" op; a prefix ``limit`` would bias toward file order). Per-batch
    combiner keeps ≤N per stratum before the shuffle (min-N by hash is a
    superset-stable partial), finisher ranks with ``cumcount`` — zero
    per-group Python."""
    from raycdc import phash as H

    ds = C.read(sf_dir, "documents", ["doc_id", "lang", "source"])

    def localmin(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["h"] = H.poly_hash(
            b["doc_id"].astype("string").to_numpy(dtype=object)
        ).astype("int64")
        return (
            b.sort_values(["lang", "source", "h", "doc_id"], kind="stable")
            .groupby(["lang", "source"], sort=False)
            .head(SAMPLE_PER_STRATUM)
        )

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        top = (
            g.sort_values(["lang", "source", "h", "doc_id"], kind="stable")
            .groupby(["lang", "source"], sort=False)
            .head(SAMPLE_PER_STRATUM)
        )
        rnk = top.groupby(["lang", "source"], sort=False).cumcount() + 1
        return pd.DataFrame(
            {
                "lang": top["lang"].to_numpy(),
                "source": top["source"].to_numpy(),
                "rnk": rnk.to_numpy().astype("int64"),
                "doc_id": top["doc_id"].to_numpy(),
            }
        )

    partial = ds.map_batches(localmin, batch_format="pandas")
    return C.by_partition(partial, "lang", finish)


def _strat_sample_sql() -> str:
    from raycdc import phash as H

    return f"""
SELECT lang, source,
       CAST(row_number() OVER w AS BIGINT) AS rnk, doc_id
FROM (SELECT lang, source, doc_id,
             {H.sql_poly("CAST(doc_id AS VARCHAR)")} AS h
      FROM documents)
WINDOW w AS (PARTITION BY lang, source ORDER BY h, doc_id)
QUALIFY row_number() OVER w <= {SAMPLE_PER_STRATUM}
"""


# -- weighted sampling (priority sampling, token-count weights) ------------

WSAMPLE_K = 100


def docs_weighted_sample(sf_dir: str):
    """Weighted sample WITHOUT replacement via PRIORITY SAMPLING
    (Duffield-Lund-Thorup): priority_i = w_i / u_i with weight
    w = n_tokens and u = (H(doc_id)+1)/(P+1) a deterministic hash-uniform;
    the K highest priorities are the sample — longer docs proportionally
    likelier, seedable, order-independent, resumable. The priority is ONE
    int64 product (< 2^49, exact in double) and ONE IEEE division — both
    exactly rounded, so numpy and DuckDB rank bit-identically with no
    float tolerance. Scale shape: per-batch local top-K combiner
    (min-K by priority is superset-stable), final K-sized sort; no
    shuffle, nothing corpus-sized leaves the workers."""
    from raycdc import phash as H

    ds = C.read(sf_dir, "documents", ["doc_id", "text"])

    def localtop(b: pd.DataFrame) -> pd.DataFrame:
        h = H.poly_hash(
            b["doc_id"].astype("string").to_numpy(dtype=object)
        ).astype("int64")
        ntok = T.token_counts(b["text"]).astype("int64").to_numpy()
        pr = (ntok * (H.P + 1)).astype("float64") / (h + 1).astype("float64")
        d = pd.DataFrame(
            {
                "doc_id": b["doc_id"].to_numpy(),
                "n_tokens": ntok,
                "priority": pr,
            }
        )
        return d.sort_values(
            ["priority", "doc_id"], ascending=[False, True], kind="stable"
        ).head(WSAMPLE_K)

    out = ds.map_batches(localtop, batch_format="pandas").to_pandas()
    top = (
        out.sort_values(
            ["priority", "doc_id"], ascending=[False, True], kind="stable"
        )
        .head(WSAMPLE_K)
        .reset_index(drop=True)
    )
    top.insert(0, "rnk", np.arange(1, len(top) + 1, dtype=np.int64))
    return top


def _wsample_sql() -> str:
    from raycdc import phash as H

    return f"""
WITH w AS (
    SELECT doc_id,
           CAST(len({T.toks_sql('text')}) AS BIGINT) AS n_tokens,
           {H.sql_poly("CAST(doc_id AS VARCHAR)")} AS h
    FROM documents
), pr AS (
    SELECT doc_id, n_tokens,
           CAST(n_tokens * {H.P + 1} AS DOUBLE) / CAST(h + 1 AS DOUBLE)
               AS priority
    FROM w
)
SELECT CAST(row_number() OVER (ORDER BY priority DESC, doc_id) AS BIGINT)
           AS rnk,
       doc_id, n_tokens, priority
FROM pr
ORDER BY rnk LIMIT {WSAMPLE_K}
"""


# -- unigram-LM familiarity scoring ----------------------------------------

LM_VOCAB_TOP = 4096


def docs_lm_familiarity(sf_dir: str):
    """Corpus-LM familiarity score per doc — the LM-quality-scoring
    pipeline SHAPE (train token statistics on the corpus, broadcast the
    model, score every doc per batch) with an integer-exact statistic in
    place of log-probabilities (ln is not correctly rounded, so cross-
    engine value-hash equality would be at the mercy of libm; the mean
    corpus frequency of a doc's tokens ranks rare-token docs the same
    way). Pass 1 folds per-batch token counts to a vocabulary-sized
    aggregate and keeps the top ``LM_VOCAB_TOP`` terms — the BOUNDED
    broadcast model (OOV frequency 0). Pass 2 scores each batch with one
    ``searchsorted`` gather against the broadcast vocab — no shuffle.
    familiarity = sum_freq / n_tokens, one exactly-rounded division."""
    import ray

    ds = C.read(sf_dir, "documents", ["text"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        toks = T.token_lists(b["text"]).explode()
        vc = toks[toks.notna()].value_counts()
        return pd.DataFrame(
            {"token": vc.index.to_numpy(), "n": vc.to_numpy().astype("int64")}
        )

    freq = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("token")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    freq["n"] = freq["n"].astype("int64")
    freq = freq.sort_values(
        ["n", "token"], ascending=[False, True], kind="stable"
    ).head(LM_VOCAB_TOP)
    order = np.argsort(freq["token"].to_numpy())
    vocab = freq["token"].to_numpy()[order]
    counts = freq["n"].to_numpy()[order]
    ref = ray.put((vocab, counts))

    docs = C.read(sf_dir, "documents", ["doc_id", "text"])

    def score(b: pd.DataFrame) -> pd.DataFrame:
        import ray as _r

        vocab_, counts_ = _r.get(ref)
        lists = T.token_lists(b["text"])
        lens = lists.str.len().fillna(0).astype("int64").to_numpy()
        flat = lists.explode()
        flat = flat[flat.notna()].to_numpy(dtype=object)
        if len(flat):
            idx = np.clip(
                np.searchsorted(vocab_, flat), 0, len(vocab_) - 1
            )
            f = np.where(vocab_[idx] == flat, counts_[idx], 0)
            bounds = np.concatenate(([0], np.cumsum(lens)))
            sums = C.segment_sum(f.astype(np.int64), bounds)
        else:
            sums = np.zeros(len(b), np.int64)
        keep = lens > 0
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].to_numpy()[keep],
                "n_tokens": lens[keep],
                "sum_freq": sums[keep].astype("int64"),
                "familiarity": sums[keep].astype("float64") / lens[keep],
            }
        )

    return docs.map_batches(score, batch_format="pandas")


LM_FAMILIARITY_SQL = f"""
WITH vocab AS (
    SELECT token, CAST(count(*) AS BIGINT) AS n
    FROM documents, unnest({T.toks_sql('text')}) AS t(token)
    GROUP BY 1 ORDER BY n DESC, token LIMIT {LM_VOCAB_TOP}
), dt AS (
    SELECT doc_id, token
    FROM documents, unnest({T.toks_sql('text')}) AS t(token)
), j AS (
    SELECT d.doc_id, coalesce(v.n, 0) AS f
    FROM dt d LEFT JOIN vocab v USING (token)
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(f) AS BIGINT) AS sum_freq,
       CAST(sum(f) AS DOUBLE) / count(*) AS familiarity
FROM j GROUP BY doc_id
"""


# -- deterministic train/val/test split ---------------------------------------

_SPLIT_MOD = 100
_SPLIT_TRAIN = 90   # h%100 <  90 → train
_SPLIT_VAL = 95     # 90–94 → val, 95–99 → test


def docs_split_assign(sf_dir: str):
    """Deterministic 90/5/5 train/val/test assignment by portable hash of
    the doc id — the standard leakage-safe split (stable across runs,
    re-shards, and corpus growth: a doc's split never depends on which other
    docs exist). Pure ``map_batches`` projection — embarrassingly parallel,
    no shuffle at any scale."""
    from raycdc import phash as H

    ds = C.read(sf_dir, "documents", ["doc_id"])

    def assign(b: pd.DataFrame) -> pd.DataFrame:
        h = (
            H.poly_hash(b["doc_id"].astype("string").to_numpy(dtype=object))
            % np.uint64(_SPLIT_MOD)
        ).astype("int64")
        split = np.where(
            h < _SPLIT_TRAIN, "train", np.where(h < _SPLIT_VAL, "val", "test")
        )
        return pd.DataFrame({"doc_id": b["doc_id"].astype("int64"), "split": split})

    return ds.map_batches(assign, batch_format="pandas")


def _split_assign_sql() -> str:
    from raycdc import phash as H

    return f"""
SELECT doc_id,
       CASE WHEN h < {_SPLIT_TRAIN} THEN 'train'
            WHEN h < {_SPLIT_VAL} THEN 'val'
            ELSE 'test' END AS split
FROM (SELECT doc_id,
             {H.sql_poly("CAST(doc_id AS VARCHAR)")} % {_SPLIT_MOD} AS h
      FROM documents)
"""


# -- train/val vocabulary drift over the leakage-safe split ------------------

VOCAB_DRIFT_TOP = 30


def docs_vocab_drift(sf_dir: str):
    """Train/val VOCABULARY DRIFT — the distribution-shift check run
    before trusting a held-out split: for the top {k} corpus terms by
    document frequency, compare each term's doc-frequency RATE between
    the train and val splits (the same leakage-safe hash split as
    ``docs_split_assign``) and report the absolute rate difference in
    basis points. Integer-exact: ``|df_t·n_v − df_v·n_t|·10⁴ //
    (n_t·n_v)`` — no float rates to drift between engines. Ranking: df
    over ALL splits, desc, term asc on ties.

    Scale shape: one pass emits per-batch DISTINCT (doc, token) counts
    tagged with the doc's split — the split is a pure hash of doc_id, so
    it is computed IN the batch (no join with an assignment table); the
    shuffle moves vocabulary-sized (token, split) partials and the final
    ranking runs on the vocabulary-sized fold. Split sizes come from one
    O(docs) column-pruned count pass.""".format(k=VOCAB_DRIFT_TOP)
    from raycdc import phash as H

    ds = C.read(sf_dir, "documents", ["doc_id", "text"])

    def _splits(doc_ids: pd.Series) -> np.ndarray:
        h = (
            H.poly_hash(doc_ids.astype("string").to_numpy(dtype=object))
            % np.uint64(_SPLIT_MOD)
        ).astype("int64")
        return np.where(
            h < _SPLIT_TRAIN, "train", np.where(h < _SPLIT_VAL, "val", "test")
        )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame(
            {
                "doc_id": b["doc_id"].astype("int64"),
                "split": _splits(b["doc_id"]),
                "token": T.token_lists(b["text"]),
            }
        ).explode("token")
        d = d[d["token"].notna()].drop_duplicates(["doc_id", "token"])
        out = d.groupby(["token", "split"], as_index=False).size().rename(
            columns={"size": "n"}
        )
        out["n"] = out["n"].astype("int64")
        return out

    folded = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(["token", "split"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    piv = folded.pivot_table(
        index="token", columns="split", values="n", aggfunc="sum", fill_value=0
    )
    for c in ("train", "val", "test"):
        if c not in piv.columns:
            piv[c] = 0
    counts = C.read(sf_dir, "documents", ["doc_id"]).map_batches(
        lambda b: pd.DataFrame({"split": _splits(b["doc_id"]), "n": np.int64(1)})
        .groupby("split", as_index=False)["n"].sum(),
        batch_format="pandas",
    ).to_pandas().groupby("split")["n"].sum()
    n_t = np.int64(counts.get("train", 0))
    n_v = np.int64(counts.get("val", 0))
    df_t = piv["train"].to_numpy(np.int64)
    df_v = piv["val"].to_numpy(np.int64)
    out = pd.DataFrame(
        {
            "token": piv.index.to_numpy(dtype=object),
            "df_train": df_t,
            "df_val": df_v,
            "df_total": (df_t + df_v + piv["test"].to_numpy(np.int64)),
            "drift_bp": (
                np.abs(df_t * n_v - df_v * n_t) * 10_000 // (n_t * n_v)
            ).astype("int64"),
        }
    )
    return (
        out.sort_values(["df_total", "token"], ascending=[False, True],
                        kind="stable")
        .head(VOCAB_DRIFT_TOP)
        .reset_index(drop=True)
    )


def _vocab_drift_sql() -> str:
    return f"""
WITH s AS ({_split_assign_sql()}),
dt AS (
  SELECT DISTINCT doc_id, token
  FROM (SELECT doc_id, unnest({T.toks_sql('text')}) AS token FROM documents)
), j AS (
  SELECT dt.token, s.split FROM dt JOIN s USING (doc_id)
), df AS (
  SELECT token,
         CAST(count(*) FILTER (split = 'train') AS BIGINT) AS df_train,
         CAST(count(*) FILTER (split = 'val') AS BIGINT) AS df_val,
         CAST(count(*) AS BIGINT) AS df_total
  FROM j GROUP BY token
), n AS (
  SELECT CAST(count(*) FILTER (split = 'train') AS BIGINT) AS n_t,
         CAST(count(*) FILTER (split = 'val') AS BIGINT) AS n_v
  FROM s
)
SELECT token, df_train, df_val, df_total,
       CAST(abs(df_train * n_v - df_val * n_t) * 10000
            // (n_t * n_v) AS BIGINT) AS drift_bp
FROM df CROSS JOIN n
ORDER BY df_total DESC, token
LIMIT {VOCAB_DRIFT_TOP}
"""


# -- corpus diversity: distinct-n ratios -------------------------------------

DIVERSITY_MAX_N = 3


def docs_distinct_ngrams(sf_dir: str):
    """Corpus DIVERSITY metrics — distinct-n (Li et al., arXiv 1510.03055,
    the standard repetitiveness gauge for generated/curated corpora): for
    n = 1..{m}, the total word n-gram count, the DISTINCT n-gram count,
    and their ratio in basis points (``distinct·10⁴ // total``, floor —
    tie-free both engines). Low distinct-2/3 flags a corpus of recycled
    boilerplate before it poisons training.

    Scale shape: per-batch partial (n, gram-hash, count) rows → one
    ``groupby(n, g).sum`` whose key space is the distinct-gram set (the
    exact path; the HLL register family in ``sketches.py`` is the
    bounded-memory alternative at extreme cardinality), then an
    O(distinct) fold to 3 rows via a second tiny aggregate. Gram hashing
    is the portable ``phash`` — identical collisions both engines, so
    the SQL twin matches hash-exactly.""".format(m=DIVERSITY_MAX_N)
    from raycdc import phash as H

    ds = C.read(sf_dir, "documents", ["text"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        lists = T.token_lists(b["text"])
        frames = []
        for n in range(1, DIVERSITY_MAX_N + 1):
            keep = lists.str.len() >= n
            if not keep.any():
                continue
            toks = lists[keep]
            counts = toks.str.len().to_numpy().astype(np.int64)
            flat = np.concatenate(
                [np.asarray(x, dtype=object) for x in toks]
            )
            if n == 1:
                grams = flat
            else:
                # contiguous n-gram join per doc: windowed elementwise
                # joins over the flat stream, masking cross-doc windows
                bounds = np.concatenate(([0], np.cumsum(counts)))
                starts = np.concatenate(
                    [np.arange(bounds[i], bounds[i + 1] - n + 1)
                     for i in range(len(counts)) if counts[i] >= n]
                )
                parts = [flat[starts + j] for j in range(n)]
                grams = np.array(
                    [" ".join(t) for t in zip(*parts)], dtype=object
                ) if len(starts) else np.zeros(0, object)
            if not len(grams):
                continue
            gh = H.poly_hash(grams).astype(np.int64)
            g, c = np.unique(gh, return_counts=True)
            frames.append(
                pd.DataFrame(
                    {"n": np.int64(n), "g": g, "c": c.astype("int64")}
                )
            )
        if not frames:
            return pd.DataFrame(
                {
                    "n": pd.Series(dtype="int64"),
                    "g": pd.Series(dtype="int64"),
                    "c": pd.Series(dtype="int64"),
                }
            )
        return pd.concat(frames, ignore_index=True)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        # bounded-partition (n, g) fold — all rows of a gram co-locate by
        # g, so the per-partition distinct/total partials are globally
        # exact; ~4x cheaper than the native hash aggregate's shuffle
        # spin-up at bench scale
        agg = g.groupby(["n", "g"], as_index=False)["c"].sum()
        return agg.groupby("n", as_index=False).agg(
            total=("c", "sum"), n_distinct=("c", "size")
        )

    folded = (
        C.by_partition(
            ds.map_batches(partial, batch_format="pandas"), "g", fold
        )
        .to_pandas()
        .groupby("n", as_index=False)
        .sum()
    )
    total = folded["total"].to_numpy(np.int64)
    distinct = folded["n_distinct"].to_numpy(np.int64)
    return pd.DataFrame(
        {
            "n": folded["n"].to_numpy(np.int64),
            "total": total,
            "n_distinct": distinct,
            "distinct_bp": (distinct * 10_000 // total).astype("int64"),
        }
    ).sort_values("n").reset_index(drop=True)


def _distinct_ngrams_sql() -> str:
    from raycdc import phash as H

    gram = H.sql_poly("array_to_string(list_slice(w, i, i + n - 1), ' ')")
    return rf"""
WITH toks AS (
  SELECT {T.toks_sql('text')} AS w FROM documents
), pos AS (
  SELECT n, w, unnest(generate_series(1, len(w) - n + 1)) AS i
  FROM toks, (SELECT unnest(generate_series(1, {DIVERSITY_MAX_N})) AS n) ns
  WHERE len(w) >= n
), grams AS (
  SELECT n, {gram} AS g FROM pos
), per_gram AS (
  SELECT n, g, count(*) AS c FROM grams GROUP BY n, g
)
SELECT CAST(n AS BIGINT) AS n,
       CAST(sum(c) AS BIGINT) AS total,
       CAST(count(*) AS BIGINT) AS n_distinct,
       CAST(count(*) * 10000 // sum(c) AS BIGINT) AS distinct_bp
FROM per_gram GROUP BY n ORDER BY n
"""


# -- BPE merge-pair statistics (tokenizer training, iteration one) ----------

BPE_PAIRS_TOP = 20


def docs_bpe_pairs(sf_dir: str):
    """The first BPE TOKENIZER-TRAINING step at corpus scale (Sennrich et
    al., arXiv 1508.07909 §3.2): with symbols = characters (iteration
    one, before any merge), count every adjacent symbol pair weighted by
    its word's corpus frequency and return the top {k} merge candidates
    (weight desc, pair asc on ties) — the argmax BPE would merge first.

    Scale shape: the corpus pass is the ``vocab_top_terms`` combiner
    (per-batch word counts, vocabulary-sized shuffle); pair extraction
    then runs over the VOCABULARY, not the token stream — a fixed-width
    numpy char view gives every (offset, word) pair in one vectorized
    slice per offset, no per-word Python — and the final fold is
    alphabet²-sized.""".format(k=BPE_PAIRS_TOP)
    ds = C.read(sf_dir, "documents", ["text"])

    def word_counts(b: pd.DataFrame) -> pd.DataFrame:
        toks = T.token_lists(b["text"]).explode()
        vc = toks[toks.notna()].value_counts()
        return pd.DataFrame(
            {"token": vc.index.to_numpy(), "c": vc.to_numpy().astype("int64")}
        )

    def pair_partial(b: pd.DataFrame) -> pd.DataFrame:
        words = b["token"].to_numpy(dtype="U")
        c = b["c"].to_numpy(np.int64)
        if not len(words):
            return pd.DataFrame(
                {"pair": pd.Series(dtype=object), "w": pd.Series(dtype="int64")}
            )
        width = words.dtype.itemsize // 4
        chars = np.ascontiguousarray(words).view(np.uint32).reshape(
            len(words), width
        )
        lens = (chars != 0).sum(axis=1)
        frames = []
        for i in range(width - 1):
            mask = lens >= i + 2
            if not mask.any():
                break
            a = chars[mask, i].astype(np.uint32)
            bch = chars[mask, i + 1].astype(np.uint32)
            pair = np.char.add(a.view("U1"), bch.view("U1"))
            frames.append(pd.DataFrame({"pair": pair, "w": c[mask]}))
        if not frames:
            return pd.DataFrame(
                {"pair": pd.Series(dtype=object), "w": pd.Series(dtype="int64")}
            )
        out = pd.concat(frames, ignore_index=True).groupby(
            "pair", as_index=False
        )["w"].sum()
        out["w"] = out["w"].astype("int64")
        return out

    folded = (
        ds.map_batches(word_counts, batch_format="pandas")
        .groupby("token")
        .aggregate(Sum("c", alias_name="c"))
        .map_batches(pair_partial, batch_format="pandas")
        .groupby("pair")
        .aggregate(Sum("w", alias_name="w"))
        .to_pandas()
    )
    folded["w"] = folded["w"].astype("int64")
    return (
        folded.sort_values(["w", "pair"], ascending=[False, True],
                           kind="stable")
        .head(BPE_PAIRS_TOP)
        .reset_index(drop=True)
    )


def _bpe_pairs_sql() -> str:
    return f"""
WITH vocab AS (
  SELECT token, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT unnest({T.toks_sql('text')}) AS token FROM documents)
  GROUP BY token
), pairs AS (
  SELECT substr(token, i, 2) AS pair, c
  FROM (SELECT token, c, unnest(generate_series(1, length(token) - 1)) AS i
        FROM vocab WHERE length(token) >= 2)
)
SELECT pair, CAST(sum(c) AS BIGINT) AS w
FROM pairs GROUP BY pair
ORDER BY w DESC, pair ASC
LIMIT {BPE_PAIRS_TOP}
"""


# -- vocabulary frequency spectrum (Zipf diagnostics) ------------------------

SPECTRUM_CLASSES = (("1", 1, 1), ("2-9", 2, 9), ("10-99", 10, 99),
                    ("100+", 100, 1 << 62))


def docs_freq_spectrum(sf_dir: str):
    """BIGRAM frequency spectrum — how many word-bigram types are hapax
    legomena (frequency 1), rare (2-9), common (10-99), or saturated
    (100+): the Zipf-tail diagnostic behind vocabulary-size and OOV-rate
    planning (a corpus whose hapax share collapses has been
    over-deduplicated; one that explodes is noise). Bigram grain because
    this corpus's unigram vocabulary is tiny and saturated — the spectrum
    must live where the tail is. All integers; share_bp = n·10⁴ // types.

    Scale shape: per-batch partial bigram counts (the windowed-join
    explode, no per-row Python) → bounded-partition fold keyed on the
    bigram (all rows of a type co-locate → exact corpus frequency) → an
    O(classes) histogram partial per partition; the driver sees
    ≤ classes × partitions rows."""
    ds = C.read(sf_dir, "documents", ["text"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        lists = T.token_lists(b["text"])
        keep = lists.str.len() >= 2
        if not keep.any():
            return pd.DataFrame(
                {"bg": pd.Series(dtype=object), "c": pd.Series(dtype="int64")}
            )
        toks = lists[keep]
        counts = toks.str.len().to_numpy().astype(np.int64)
        flat = np.concatenate([np.asarray(x, dtype=object) for x in toks])
        bounds = np.concatenate(([0], np.cumsum(counts)))
        starts = np.concatenate(
            [np.arange(bounds[i], bounds[i + 1] - 1)
             for i in range(len(counts))]
        )
        bg = pd.Series(flat[starts]) + " " + pd.Series(flat[starts + 1])
        vc = bg.value_counts()
        return pd.DataFrame(
            {"bg": vc.index.to_numpy(), "c": vc.to_numpy().astype("int64")}
        )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("bg", as_index=False)["c"].sum()
        c = agg["c"].to_numpy(np.int64)
        rows = []
        for name, lo, hi in SPECTRUM_CLASSES:
            rows.append((name, int(((c >= lo) & (c <= hi)).sum())))
        return pd.DataFrame(rows, columns=["freq_class", "n_types"])

    spec = (
        C.by_partition(
            ds.map_batches(partial, batch_format="pandas"), "bg", fold
        )
        .to_pandas()
        .groupby("freq_class", as_index=False)["n_types"]
        .sum()
    )
    spec = spec[spec["n_types"] > 0]
    vocab = int(spec["n_types"].sum())
    order = {name: i for i, (name, _, _) in enumerate(SPECTRUM_CLASSES)}
    spec = spec.sort_values(
        "freq_class", key=lambda s: s.map(order), kind="stable"
    ).reset_index(drop=True)
    n_types = spec["n_types"].to_numpy(np.int64)
    return pd.DataFrame(
        {
            "freq_class": spec["freq_class"].to_numpy(dtype=object),
            "n_types": n_types.astype("int64"),
            "share_bp": (n_types * 10_000 // vocab).astype("int64"),
        }
    )


def _freq_spectrum_sql() -> str:
    cases = " ".join(
        f"WHEN c BETWEEN {lo} AND {hi} THEN '{name}'"
        for name, lo, hi in SPECTRUM_CLASSES
    )
    ranks = ", ".join(
        f"('{name}', {i})" for i, (name, _, _) in enumerate(SPECTRUM_CLASSES)
    )
    return f"""
WITH toks AS (
  SELECT {T.toks_sql('text')} AS w FROM documents
), g AS (
  SELECT w[i] || ' ' || w[i + 1] AS bg
  FROM (SELECT w, unnest(generate_series(1, len(w) - 1)) AS i
        FROM toks WHERE len(w) >= 2)
), vc AS (
  SELECT bg, count(*) AS c FROM g GROUP BY bg
), cls AS (
  SELECT CASE {cases} END AS freq_class FROM vc
), spec AS (
  SELECT freq_class, CAST(count(*) AS BIGINT) AS n_types
  FROM cls GROUP BY freq_class
), rk(freq_class, r) AS (VALUES {ranks})
SELECT s.freq_class, s.n_types,
       CAST(s.n_types * 10000 // sum(s.n_types) OVER () AS BIGINT)
           AS share_bp
FROM spec s JOIN rk USING (freq_class) ORDER BY rk.r
"""


# -- train/test contamination scan (decontamination) ------------------------

CONTAM_N = 8  # word n-gram window (the standard 8-13-gram decontam range)


def _gram_rows(
    b: pd.DataFrame, lo: int, hi: int
) -> tuple[np.ndarray, np.ndarray]:
    """(doc_id, gram_hash) pairs for the batch's docs whose split bucket
    (portable hash of doc_id, the ``docs_split_assign`` law) lies in
    [lo, hi). Vectorized: pandas explode → object-array window concat (N
    elementwise joins) → one poly_hash matrix pass."""
    from raycdc import phash as H

    hb = H.poly_hash(
        b["doc_id"].astype("string").to_numpy(dtype=object)
    ) % np.uint64(_SPLIT_MOD)
    sel = (hb >= lo) & (hb < hi)
    lists = T.token_lists(b.loc[sel, "text"])
    keep = lists.str.len() > 0
    if not keep.any():
        return np.zeros(0, np.int64), np.zeros(0, np.uint64)
    d = pd.DataFrame(
        {
            "doc_id": b.loc[sel, "doc_id"][keep].astype("int64").to_numpy(),
            "tok": lists[keep].to_numpy(),
        }
    )
    e = d.explode("tok", ignore_index=True)
    arr = e["tok"].to_numpy(dtype=object)
    did = e["doc_id"].to_numpy()
    n = len(arr)
    if n < CONTAM_N:
        return np.zeros(0, np.int64), np.zeros(0, np.uint64)
    g = arr[: n - CONTAM_N + 1].copy()
    for j in range(1, CONTAM_N):
        g = g + " "
        g = g + arr[j : n - CONTAM_N + 1 + j]
    valid = did[: n - CONTAM_N + 1] == did[CONTAM_N - 1 :]
    return did[: n - CONTAM_N + 1][valid], H.poly_hash(g[valid])


def docs_contamination(sf_dir: str):
    """Decontamination scan: TRAIN documents sharing at least one exact
    word 8-gram with any TEST document (the ``docs_split_assign`` split),
    with the count of distinct shared grams — the standard benchmark-leak
    check run before LLM training (n-gram overlap decontamination).

    Scale shape: two passes, NO shuffle. Pass 1 distills the test side to
    a distinct gram-hash set — test/benchmark corpora are small by design,
    so the set is gathered once and broadcast (ray.put), never re-shipped
    per batch. Pass 2 streams the train side: per batch, gram hashes →
    ``np.isin`` against the broadcast set → per-doc distinct count via one
    sort + boundary scan (a doc is one row, so per-batch counts are
    final). Gram hashing uses the portable poly-hash family so the DuckDB
    oracle computes the identical hashes (identical collisions included)."""
    import ray

    ds = C.read(sf_dir, "documents", ["doc_id", "text"])

    def test_side(b: pd.DataFrame) -> pd.DataFrame:
        _, gh = _gram_rows(b, _SPLIT_VAL, _SPLIT_MOD)
        return pd.DataFrame({"g": np.unique(gh)})

    # gather the distilled test set once (small by design), broadcast it
    tdf = ds.map_batches(test_side, batch_format="pandas").to_pandas()
    test_grams = (
        np.unique(tdf["g"].to_numpy().astype(np.uint64))
        if len(tdf)
        else np.zeros(0, np.uint64)
    )
    test_ref = ray.put(test_grams)

    def train_scan(b: pd.DataFrame) -> pd.DataFrame:
        tg = ray.get(test_ref)
        did, gh = _gram_rows(b, 0, _SPLIT_TRAIN)
        m = np.isin(gh, tg)
        did, gh = did[m], gh[m]
        if not len(did):
            return pd.DataFrame(
                {
                    "doc_id": pd.Series(dtype="int64"),
                    "n_shared": pd.Series(dtype="int64"),
                }
            )
        order = np.lexsort((gh, did))
        did, gh = did[order], gh[order]
        uniq = np.ones(len(did), bool)
        uniq[1:] = (did[1:] != did[:-1]) | (gh[1:] != gh[:-1])
        docs, counts = np.unique(did[uniq], return_counts=True)
        return pd.DataFrame(
            {"doc_id": docs.astype("int64"), "n_shared": counts.astype("int64")}
        )

    return ds.map_batches(train_scan, batch_format="pandas")


def _contamination_sql() -> str:
    from raycdc import phash as H

    gram = H.sql_poly(f"array_to_string(list_slice(w, i, i + {CONTAM_N} - 1), ' ')")
    return rf"""
WITH toks AS (
  SELECT doc_id, w
  FROM (SELECT doc_id, {T.toks_sql('text')} AS w FROM documents)
  WHERE len(w) >= {CONTAM_N}
), pos AS (
  SELECT doc_id, w, unnest(generate_series(1, len(w) - {CONTAM_N} + 1)) AS i
  FROM toks
), grams AS (
  SELECT doc_id, {gram} AS g FROM pos
), split AS (
  SELECT doc_id, {H.sql_poly("CAST(doc_id AS VARCHAR)")} % {_SPLIT_MOD} AS h
  FROM documents
), tg AS (
  SELECT DISTINCT g FROM grams JOIN split USING (doc_id)
  WHERE h >= {_SPLIT_VAL}
)
SELECT grams.doc_id, CAST(count(DISTINCT grams.g) AS BIGINT) AS n_shared
FROM grams JOIN split USING (doc_id) JOIN tg ON grams.g = tg.g
WHERE split.h < {_SPLIT_TRAIN}
GROUP BY grams.doc_id
"""


# -- sequence packing (offset-based concat packing) ----------------------------

PACK_BUDGET = 256     # tokens per context window
PACK_BUCKET = 100     # docs per independent packing unit


def doc_pack_offsets(sf_dir: str):
    """Sequence packing for training: documents are concatenated in doc-id
    order inside fixed buckets of 100 ids and assigned to ``PACK_BUDGET``-
    token context windows by their START offset (offset-based concat
    packing — docs may straddle a window boundary, exactly like
    concat-then-chunk LM data prep; greedy first-fit packing is inherently
    sequential, offset packing is one cumsum, vectorized on both sides).

    Scale shape: buckets are independent, so ``by_partition(pack_bucket)``
    co-locates each bucket and ONE kernel does sort + C-speed
    ``groupby().cumsum()`` per partition; the oracle is a plain window
    running sum. No driver materialization beyond the result."""
    ds = C.read(sf_dir, "documents", ["doc_id", "text"])

    def with_bucket(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].astype("int64"),
                "pack_bucket": (b["doc_id"] // PACK_BUCKET).astype("int64"),
                "n_tokens": T.token_counts(b["text"]).astype("int64"),
            }
        )

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["pack_bucket", "doc_id"], kind="stable")
        off = g.groupby("pack_bucket")["n_tokens"].cumsum() - g["n_tokens"]
        g = g.assign(
            tok_offset=off.astype("int64"),
            bin_id=(off // PACK_BUDGET).astype("int64"),
        )
        return g[["doc_id", "pack_bucket", "bin_id", "tok_offset", "n_tokens"]]

    keyed = ds.map_batches(with_bucket, batch_format="pandas")
    return C.by_partition(keyed, "pack_bucket", kernel)


PACK_OFFSETS_SQL = rf"""
WITH t AS (
    SELECT doc_id, doc_id // {PACK_BUCKET} AS pack_bucket,
           CAST(len({T.toks_sql('text')}) AS BIGINT) AS n_tokens
    FROM documents
), o AS (
    -- window sum() yields DECIMAL (float64 in pandas) — cast back to the
    -- engine's int64 so the value hash matches (r03 red-row root cause)
    SELECT doc_id, pack_bucket, n_tokens,
           CAST(sum(n_tokens) OVER (PARTITION BY pack_bucket ORDER BY doc_id
                                    ROWS UNBOUNDED PRECEDING) - n_tokens
                AS BIGINT) AS tok_offset
    FROM t
)
SELECT doc_id, pack_bucket, CAST(tok_offset // {PACK_BUDGET} AS BIGINT) AS bin_id,
       tok_offset, n_tokens
FROM o
"""


# -- intra-corpus duplicated-span detection (exact substring dedup) ----------


def _gram_pos_rows(
    b: pd.DataFrame,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(doc_id, 1-based gram position, gram hash) for EVERY word
    CONTAM_N-gram of the batch's docs — the positional variant of
    :func:`_gram_rows` (which keeps only doc-level hashes). Same
    vectorized shape: explode → N elementwise window joins → one
    poly_hash pass; positions come from a per-doc offset subtraction
    (docs are contiguous in the explode, doc_id is unique per row)."""
    from raycdc import phash as H

    z = np.zeros(0, np.int64)
    lists = T.token_lists(b["text"])
    keep = lists.str.len() >= CONTAM_N
    if not keep.any():
        return z, z, np.zeros(0, np.uint64)
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
    g = arr[: n - CONTAM_N + 1].copy()
    for j in range(1, CONTAM_N):
        g = g + " "
        g = g + arr[j : n - CONTAM_N + 1 + j]
    valid = did[: n - CONTAM_N + 1] == did[CONTAM_N - 1 :]
    doc_start = np.concatenate(
        [np.zeros(1, np.int64), np.flatnonzero(did[1:] != did[:-1]) + 1]
    )
    counts = np.diff(np.append(doc_start, n))
    pos = np.arange(n, dtype=np.int64) - np.repeat(doc_start, counts) + 1
    head = slice(0, n - CONTAM_N + 1)
    return did[head][valid], pos[head][valid], H.poly_hash(g[valid])


def _dup_hits(ds):
    """(doc_id, i) positions of every word 8-gram whose exact text occurs
    >= 2 times anywhere in the corpus — the shared front half of
    ``docs_dup_spans`` (span reporting) and ``docs_dedup_cut`` (the cut
    corpus). Partial counts shuffle as int64 pairs; the duplicated-gram
    set joins back with a hash ``Dataset.join`` (corpus-sized worst case,
    so never a broadcast); all join inputs are explicit-schema Arrow so
    empty blocks survive the shuffle."""

    def count_partial(b: pd.DataFrame) -> pa.Table:
        _, _, gh = _gram_pos_rows(b)
        g, c = np.unique(gh, return_counts=True)
        return pa.table(
            {
                "g": pa.array(g.astype(np.int64), pa.int64()),
                "c": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    def only_dups(t: pa.Table) -> pa.Table:
        m = pc.greater_equal(t.column("sum(c)"), pa.scalar(2))
        return pa.table({"g": t.column("g").filter(m).cast(pa.int64())})

    dup = (
        ds.map_batches(count_partial, batch_format="pandas")
        .groupby("g")
        .sum("c")
        .map_batches(only_dups, batch_format="pyarrow")
    )

    def pos_rows(b: pd.DataFrame) -> pa.Table:
        did, pos, gh = _gram_pos_rows(b)
        return pa.table(
            {
                "doc_id": pa.array(did.astype(np.int64), pa.int64()),
                "i": pa.array(pos, pa.int64()),
                "g": pa.array(gh.astype(np.int64), pa.int64()),
            }
        )

    return ds.map_batches(pos_rows, batch_format="pandas").join(
        dup,
        join_type="inner",
        num_partitions=C.join_partitions(),
        on=("g",),
    )


def docs_dup_spans(sf_dir: str):
    """Exact duplicated-substring spans — the corpus-dedup primitive of
    Lee et al., *Deduplicating Training Data Makes Language Models Better*
    (exact-substring variant): for each document, the MAXIMAL runs of word
    8-grams whose exact text occurs ≥ 2 times anywhere in the corpus
    (another doc or a repeat within the same doc). Output one row per
    merged span: (doc_id, span_start, span_end, n_grams), token positions
    1-based inclusive — the spans a dedup pass would cut before training.

    Scale shape (100 TB): (1) per-batch PARTIAL gram-hash counts →
    ``groupby(g).sum`` — the all-to-all moves pre-aggregated int64 pairs,
    never gram strings; (2) the duplicated-gram set joins back to the
    position stream with a hash ``Dataset.join`` — at corpus scale that
    set is corpus-sized in the worst case, so a broadcast would NOT be
    scale-safe (contamination's broadcast relies on the test side being
    small by design; this one cannot); (3) span merge is gaps-and-islands
    on sorted positions inside a bounded partition (``C.by_partition``) —
    one vectorized kernel per partition, never per doc. Join inputs
    return explicit-schema Arrow tables so empty blocks keep their schema
    through the hash shuffle (the r3 ``neardup_clusters`` lesson)."""

    ds = C.read(sf_dir, "documents", ["doc_id", "text"])
    hits = _dup_hits(ds)

    def merge_spans(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame(
                {
                    "doc_id": pd.Series(dtype="int64"),
                    "span_start": pd.Series(dtype="int64"),
                    "span_end": pd.Series(dtype="int64"),
                    "n_grams": pd.Series(dtype="int64"),
                }
            )
        d = g.sort_values(["doc_id", "i"])
        did = d["doc_id"].to_numpy()
        i = d["i"].to_numpy()
        new = np.ones(len(d), bool)
        new[1:] = (did[1:] != did[:-1]) | (i[1:] != i[:-1] + 1)
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(d)) - 1
        return pd.DataFrame(
            {
                "doc_id": did[starts].astype("int64"),
                "span_start": i[starts].astype("int64"),
                "span_end": (i[ends] + CONTAM_N - 1).astype("int64"),
                "n_grams": (ends - starts + 1).astype("int64"),
            }
        )

    return C.by_partition(
        hits.select_columns(["doc_id", "i"]), "doc_id", merge_spans
    )


def docs_dedup_cut(sf_dir: str):
    """The TERMINAL artifact of exact-substring dedup (Lee et al.,
    arXiv 2107.06499): cut every token covered by a duplicated 8-gram and
    reassemble each document's CLEAN text — what actually ships to
    tokenization, where ``docs_dup_spans`` only reports the spans. Output
    (doc_id, n_kept, n_cut, text_clean), token-joined with single spaces;
    documents whose every token is covered drop out entirely (both
    engines agree — the group-by sees no surviving rows).

    Scale shape (100 TB): the shared ``_dup_hits`` front half (partial
    int64 counts → hash join-back, never a broadcast), then (1) each hit
    expands to its 8 covered positions with a batch-local ``np.unique``
    (≈8× volume cut before the shuffle), (2) covered positions anti-join
    the token stream (``left_anti`` hash join — the only corpus-sized
    exchange, and it carries each token once), (3) per-doc reassembly in
    a bounded ``by_partition`` kernel (lexsort + C-speed group join, the
    ``cdc_conv_text`` pattern)."""
    ds = C.read(sf_dir, "documents", ["doc_id", "text"])

    def expand_cover(t: pa.Table) -> pa.Table:
        did = t.column("doc_id").to_numpy(zero_copy_only=False)
        i = t.column("i").to_numpy(zero_copy_only=False)
        n = len(did)
        if n == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "i": pa.array([], pa.int64())}
            )
        off = np.tile(np.arange(CONTAM_N, dtype=np.int64), n)
        dd = np.repeat(did, CONTAM_N)
        jj = np.repeat(i, CONTAM_N) + off
        # batch-local dedup (overlapping grams cover the same tokens):
        # pack (doc_id, pos) into one int64 — doc ids are < 2^31
        packed = np.unique(dd * (np.int64(1) << 32) + jj)
        return pa.table(
            {
                "doc_id": pa.array(packed >> 32, pa.int64()),
                "i": pa.array(packed & ((np.int64(1) << 32) - 1), pa.int64()),
            }
        )

    covered = _dup_hits(ds).map_batches(expand_cover, batch_format="pyarrow")

    def token_rows(b: pd.DataFrame) -> pa.Table:
        lists = T.token_lists(b["text"])
        counts = lists.str.len().to_numpy().astype(np.int64)
        keep = counts > 0
        did = b.loc[keep, "doc_id"].astype("int64").to_numpy()
        cnt = counts[keep]
        flat = np.concatenate(
            [np.asarray(x, dtype=object) for x in lists[keep]]
        ) if keep.any() else np.zeros(0, object)
        pos = np.concatenate([np.arange(1, c + 1) for c in cnt]) if keep.any() \
            else np.zeros(0, np.int64)
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(did, cnt), pa.int64()),
                "i": pa.array(pos.astype(np.int64), pa.int64()),
                "t": pa.array(flat, pa.string()),
                "n_tok": pa.array(np.repeat(cnt, cnt), pa.int64()),
            }
        )

    kept = ds.map_batches(token_rows, batch_format="pandas").join(
        covered,
        join_type="left_anti",
        num_partitions=C.join_partitions(),
        on=("doc_id", "i"),
    )

    def assemble(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame(
                {
                    "doc_id": pd.Series(dtype="int64"),
                    "n_kept": pd.Series(dtype="int64"),
                    "n_cut": pd.Series(dtype="int64"),
                    "text_clean": pd.Series(dtype=object),
                }
            )
        d = g.sort_values(["doc_id", "i"], kind="stable")
        key = d["doc_id"].to_numpy()
        grp = d["t"].groupby(key)
        doc = grp.agg(" ".join)
        n_kept = grp.size().to_numpy().astype("int64")
        n_tok = d["n_tok"].groupby(key).first().to_numpy().astype("int64")
        return pd.DataFrame(
            {
                "doc_id": doc.index.to_numpy().astype("int64"),
                "n_kept": n_kept,
                "n_cut": n_tok - n_kept,
                "text_clean": doc.to_numpy(dtype=object),
            }
        )

    return C.by_partition(kept, "doc_id", assemble)


def _dedup_cut_sql() -> str:
    from raycdc import phash as H

    gram = H.sql_poly(
        f"array_to_string(list_slice(w, i, i + {CONTAM_N} - 1), ' ')"
    )
    return rf"""
WITH toks AS (
  SELECT doc_id, {T.toks_sql('text')} AS w FROM documents
), tok AS (
  SELECT doc_id, i, w[i] AS t, len(w) AS n_tok
  FROM (SELECT doc_id, w, unnest(generate_series(1, len(w))) AS i
        FROM toks WHERE len(w) >= 1)
), gpos AS (
  SELECT doc_id, w, unnest(generate_series(1, len(w) - {CONTAM_N} + 1)) AS i
  FROM toks WHERE len(w) >= {CONTAM_N}
), grams AS (
  SELECT doc_id, i, {gram} AS g FROM gpos
), dup AS (
  SELECT g FROM grams GROUP BY g HAVING count(*) >= 2
), hits AS (
  SELECT doc_id, i FROM grams JOIN dup USING (g)
), cov AS (
  SELECT DISTINCT doc_id, i + o AS i
  FROM hits, (SELECT unnest(generate_series(0, {CONTAM_N} - 1)) AS o) e
), kept AS (
  SELECT tok.doc_id, tok.i, tok.t, tok.n_tok
  FROM tok LEFT JOIN cov ON tok.doc_id = cov.doc_id AND tok.i = cov.i
  WHERE cov.i IS NULL
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
       CAST(max(n_tok) - count(*) AS BIGINT) AS n_cut,
       string_agg(t, ' ' ORDER BY i) AS text_clean
FROM kept GROUP BY doc_id
"""


def _dup_spans_sql() -> str:
    from raycdc import phash as H

    gram = H.sql_poly(
        f"array_to_string(list_slice(w, i, i + {CONTAM_N} - 1), ' ')"
    )
    return rf"""
WITH toks AS (
  SELECT doc_id, w
  FROM (SELECT doc_id, {T.toks_sql('text')} AS w FROM documents)
  WHERE len(w) >= {CONTAM_N}
), pos AS (
  SELECT doc_id, w, unnest(generate_series(1, len(w) - {CONTAM_N} + 1)) AS i
  FROM toks
), grams AS (
  SELECT doc_id, i, {gram} AS g FROM pos
), dup AS (
  SELECT g FROM grams GROUP BY g HAVING count(*) >= 2
), hits AS (
  SELECT doc_id, i FROM grams JOIN dup USING (g)
), isl AS (
  SELECT doc_id, i,
         i - row_number() OVER (PARTITION BY doc_id ORDER BY i) AS grp
  FROM hits
)
SELECT doc_id, CAST(min(i) AS BIGINT) AS span_start,
       CAST(max(i) + {CONTAM_N} - 1 AS BIGINT) AS span_end,
       CAST(count(*) AS BIGINT) AS n_grams
FROM isl GROUP BY doc_id, grp
"""


# -- BM25 retrieval ----------------------------------------------------------

BM25_QUERY = ("merge", "window", "stream")
BM25_K1, BM25_B, BM25_TOPK = 1.2, 0.75, 20


def _bm25_stats(sf_dir: str) -> tuple[int, dict, float]:
    """One distributed pass → (N, df per query term, avgdl). The float
    idf/avgdl derived from these ints are computed ONCE here and embedded
    as literals in BOTH engines (repr round-trips doubles exactly), so
    every downstream float op sees bit-identical inputs."""
    import pyarrow.parquet as pq

    n_docs = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    ds = C.read(sf_dir, "documents", ["doc_id", "text"])
    terms = list(BM25_QUERY)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        toks = T.token_lists(b["text"])
        row = {"dl_sum": [int(toks.str.len().sum())]}
        for i, t in enumerate(terms):
            row[f"df{i}"] = [int(toks.map(lambda l, t=t: t in l).sum())]
        return pd.DataFrame(row)

    agg = ds.map_batches(partial, batch_format="pandas").to_pandas().sum()
    df = {t: int(agg[f"df{i}"]) for i, t in enumerate(terms)}
    avgdl = float(agg["dl_sum"]) / float(n_docs)
    return n_docs, df, avgdl


def _bm25_idf(n_docs: int, df: int) -> float:
    return float(np.log((n_docs - df + 0.5) / (df + 0.5) + 1.0))


def docs_bm25_topk(sf_dir: str):
    """Top-20 documents by BM25 for a fixed query — the lexical-retrieval
    operator beside the ANN family. Cross-engine exactness without exact
    logs: the only transcendental inputs (idf per term, avgdl) are
    computed once from EXACT integer statistics and embedded as double
    literals in both the numpy kernel and the SQL oracle, after which
    every op (·, /, +) is IEEE-exactly-rounded in the same order — the
    unrounded scores are bit-identical, so the (score desc, doc_id)
    ranking needs no tolerance. Scale shape: one bounded stats pass, then
    one scoring pass with per-batch explode→tf→pivot and a LOCAL top-k
    combiner (superset-stable) — only K rows per block reach the driver."""
    n_docs, dfm, avgdl = _bm25_stats(sf_dir)
    terms = list(BM25_QUERY)
    idf = [_bm25_idf(n_docs, dfm[t]) for t in terms]
    k1, b = BM25_K1, BM25_B

    ds = C.read(sf_dir, "documents", ["doc_id", "text"])

    def score(bt: pd.DataFrame) -> pd.DataFrame:
        toks = T.token_lists(bt["text"])
        dl = toks.str.len().to_numpy().astype(np.int64)
        base = pd.DataFrame(
            {"doc_id": bt["doc_id"].astype("int64"), "dl": dl}
        )
        e = bt[["doc_id"]].assign(token=toks).explode("token")
        e = e[e["token"].isin(terms)]
        tf = (
            e.groupby(["doc_id", "token"]).size().unstack(fill_value=0)
            if len(e)
            else pd.DataFrame()
        )
        s = np.zeros(len(base), np.float64)
        for i, t in enumerate(terms):
            if len(tf) and t in tf.columns:
                tfv = (
                    tf[t]
                    .reindex(base["doc_id"].to_numpy())
                    .fillna(0)
                    .to_numpy()
                    .astype(np.int64)
                )
            else:
                tfv = np.zeros(len(base), np.int64)
            s = s + idf[i] * (tfv * (k1 + 1.0)) / (
                tfv + k1 * (1.0 - b + b * dl / avgdl)
            )
        base["score"] = s
        hit = base[base["score"] > 0.0]
        return hit.sort_values(
            ["score", "doc_id"], ascending=[False, True], kind="stable"
        ).head(BM25_TOPK)[["doc_id", "score"]]

    parts = ds.map_batches(score, batch_format="pandas").to_pandas()
    top = (
        parts.sort_values(
            ["score", "doc_id"], ascending=[False, True], kind="stable"
        )
        .head(BM25_TOPK)
        .reset_index(drop=True)
    )
    top.insert(0, "rnk", np.arange(1, len(top) + 1, dtype=np.int64))
    top["score"] = top["score"].round(C.ROUND_DIGITS)
    return top


def _bm25_sql(sf_dir: str) -> str:
    n_docs, dfm, avgdl = _bm25_stats(sf_dir)
    terms = list(BM25_QUERY)
    k1, b = BM25_K1, BM25_B
    tf_cols = ",\n         ".join(
        f"CAST(len(list_filter(t, x -> x = '{t}')) AS BIGINT) AS tf{i}"
        for i, t in enumerate(terms)
    )
    score_terms = " + ".join(
        f"{_bm25_idf(n_docs, dfm[t])!r} * (tf{i} * {k1 + 1.0!r})"
        f" / (tf{i} + {k1!r} * ({1.0 - b!r} + {b!r} * CAST(dl AS DOUBLE)"
        f" / {avgdl!r}))"
        for i, t in enumerate(terms)
    )
    return f"""
WITH toks AS (
  SELECT doc_id, {T.toks_sql('text')} AS t FROM documents
), d AS (
  SELECT doc_id, CAST(len(t) AS BIGINT) AS dl,
         {tf_cols}
  FROM toks
), s AS (
  SELECT doc_id, {score_terms} AS score FROM d
)
SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT)
           AS rnk,
       doc_id, round(score, 4) AS score
FROM s WHERE score > 0
ORDER BY rnk LIMIT {BM25_TOPK}
"""


# -- global percentile length clip ------------------------------------------

CLIP_LO_FRAC, CLIP_HI_FRAC = 0.05, 0.95


def docs_length_clip(sf_dir: str):
    """Keep docs whose length sits inside the corpus's [p5, p95] band —
    the global-percentile outlier clip every pretraining pipeline runs
    before tokenization (drops empty shells and mega-docs). The exact
    band edges are ORDER STATISTICS at ranks ``floor(f·(n−1))``
    (0-indexed, the tie-free contract both sides share), found by the
    sketch-guided distributed selection (:func:`_kth_smallest` — two
    bounded passes per edge, no sort); the clip itself is one
    broadcast-threshold filter pass. Nothing corpus-sized leaves the
    workers."""
    import os as _os

    import pyarrow.parquet as _pq

    from raycdc.queries.events import _kth_smallest

    n = _pq.ParquetFile(
        _os.path.join(sf_dir, "documents.parquet")
    ).metadata.num_rows
    ds = C.read(sf_dir, "documents", ["doc_id", "source", "n_chars"])

    def to_i64(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"v": b["n_chars"].astype("int64")})

    lens = ds.map_batches(to_i64, batch_format="pandas")
    lo = _kth_smallest(lens, "v", int(np.floor(CLIP_LO_FRAC * (n - 1))))
    hi = _kth_smallest(lens, "v", int(np.floor(CLIP_HI_FRAC * (n - 1))))

    def keep(b: pd.DataFrame) -> pd.DataFrame:
        v = b["n_chars"].astype("int64")
        m = (v >= lo) & (v <= hi)
        out = b.loc[m, ["doc_id", "source", "n_chars"]].copy()
        out["doc_id"] = out["doc_id"].astype("int64")
        out["n_chars"] = out["n_chars"].astype("int64")
        return out

    return (
        ds.map_batches(keep, batch_format="pandas")
        .to_pandas()
        .sort_values("doc_id", kind="stable")
        .reset_index(drop=True)
    )


def _length_clip_sql() -> str:
    lo_rank = f"CAST(floor({CLIP_LO_FRAC} * (count(*) OVER () - 1)) AS BIGINT)"
    hi_rank = f"CAST(floor({CLIP_HI_FRAC} * (count(*) OVER () - 1)) AS BIGINT)"
    return f"""
WITH r AS (
  SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars,
         row_number() OVER (ORDER BY n_chars) - 1 AS rk,
         {lo_rank} AS lo_rank, {hi_rank} AS hi_rank
  FROM documents
), b AS (
  SELECT (SELECT n_chars FROM r WHERE rk = lo_rank) AS lo,
         (SELECT n_chars FROM r WHERE rk = hi_rank) AS hi
)
SELECT doc_id, source, n_chars
FROM documents, b
WHERE n_chars >= b.lo AND n_chars <= b.hi
ORDER BY doc_id
"""


# -- per-source char-budget quota (data-mixture primitive) ------------------

BUDGET_CHARS = 3000
_BUD_SHIFT = 19  # hash space P < 2^31 → 4096 equal-width buckets


def docs_char_budget(sf_dir: str):
    """Per-source character-budget quota: keep each source's docs in
    deterministic hash order (H(doc_id), doc_id) until the running char
    total reaches BUDGET_CHARS, including the doc that crosses the line —
    the greedy budgeted selection behind "X tokens per domain" data
    mixtures (seedable, order-independent, resumable: the kept set is a
    pure function of doc ids).

    The window cumsum the SQL oracle uses would need a per-source global
    sort; the distributed shape is EXACT WEIGHTED SELECTION instead
    (the weighted generalization of :func:`_ranks_smallest_by`): pass A
    folds a (source × 4096-bucket) weighted histogram (hashes are
    uniform, so equal-width buckets split mass evenly) and the driver
    walks each source's cumulative mass to the budget-crossing bucket;
    pass B ships only crossing-bucket rows (≈ 1/4096 of each source) to
    the driver to pin the exact cutoff key; pass C filters by broadcast
    cutoff. Three bounded passes, zero sorts, zero shuffles. At domain
    cardinalities where (sources × touched buckets) outgrows the driver,
    pass A's fold becomes a distributed ``by_partition(source)`` walk —
    the per-source logic is unchanged."""
    import ray as _ray

    from raycdc import phash as H

    ds = C.read(sf_dir, "documents", ["doc_id", "source", "n_chars"])

    def with_key(b: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "source": b["source"].astype(object),
                "doc_id": b["doc_id"].astype("int64"),
                "n_chars": b["n_chars"].astype("int64"),
            }
        )
        out["hk"] = H.poly_hash(
            b["doc_id"].astype("string").to_numpy(dtype=object)
        ).astype("int64")
        out["bk"] = (out["hk"].to_numpy() >> _BUD_SHIFT).astype("int64")
        return out

    keyed = ds.map_batches(with_key, batch_format="pandas").materialize()

    def phist(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby(["source", "bk"], as_index=False)["n_chars"].sum()

    hist = (
        keyed.map_batches(phist, batch_format="pandas")
        .to_pandas()
        .groupby(["source", "bk"], as_index=False)["n_chars"]
        .sum()
    )
    cross_bk: dict = {}   # source -> crossing bucket
    mass_below: dict = {}
    keep_all: set = set()
    for src, sub in hist.groupby("source"):
        sub = sub.sort_values("bk")
        cum = np.cumsum(sub["n_chars"].to_numpy(np.int64))
        if cum[-1] < BUDGET_CHARS:
            keep_all.add(src)
            continue
        i = int(np.searchsorted(cum, BUDGET_CHARS))
        cross_bk[src] = int(sub["bk"].iloc[i])
        mass_below[src] = int(cum[i - 1]) if i else 0
    bref = C.broadcast(cross_bk)

    def pcross(b: pd.DataFrame) -> pd.DataFrame:
        bm = _ray.get(bref)
        tgt = b["source"].map(bm).fillna(-1).to_numpy(np.int64)
        return b[b["bk"].to_numpy() == tgt]

    rows = keyed.map_batches(pcross, batch_format="pandas").to_pandas()
    P_SENTINEL = (int(H.P), np.iinfo("int64").max)
    cutoff = {s: P_SENTINEL for s in keep_all}
    for src, sub in rows.groupby("source"):
        sub = sub.sort_values(["hk", "doc_id"], kind="stable")
        remaining = BUDGET_CHARS - mass_below[src]
        cum = np.cumsum(sub["n_chars"].to_numpy(np.int64))
        j = int(np.searchsorted(cum, remaining))  # crossing doc index
        cutoff[src] = (int(sub["hk"].iloc[j]), int(sub["doc_id"].iloc[j]))
    cref = C.broadcast(cutoff)

    def pkeep(b: pd.DataFrame) -> pd.DataFrame:
        cm = _ray.get(cref)
        hs = b["source"].map({s: h for s, (h, d) in cm.items()}).to_numpy(np.int64)
        dstar = b["source"].map({s: d for s, (h, d) in cm.items()}).to_numpy(np.int64)
        hk = b["hk"].to_numpy(np.int64)
        did = b["doc_id"].to_numpy(np.int64)
        keep = (hk < hs) | ((hk == hs) & (did <= dstar))
        return b.loc[keep, ["source", "doc_id", "n_chars"]]

    out = keyed.map_batches(pkeep, batch_format="pandas").to_pandas()
    out["doc_id"] = out["doc_id"].astype("int64")
    out["n_chars"] = out["n_chars"].astype("int64")
    return out.sort_values(["source", "doc_id"], kind="stable").reset_index(
        drop=True
    )


def _char_budget_sql() -> str:
    from raycdc import phash as H

    return f"""
WITH h AS (
  SELECT source, doc_id, CAST(n_chars AS BIGINT) AS n_chars,
         {H.sql_poly("CAST(doc_id AS VARCHAR)")} AS hk
  FROM documents
), c AS (
  SELECT source, doc_id, n_chars,
         sum(n_chars) OVER (PARTITION BY source ORDER BY hk, doc_id
                            ROWS UNBOUNDED PRECEDING) - n_chars AS prev
  FROM h
)
SELECT source, doc_id, n_chars FROM c WHERE prev < {BUDGET_CHARS}
ORDER BY source, doc_id
"""


# -- DSIR importance weights --------------------------------------------------

DSIR_BUCKETS = 256
DSIR_SCALE = 10_000  # LUT quantum: 1e-4 nats per unit


def _dsir_bigrams(texts: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(flat bucket ids, per-doc cumulative bounds) for a batch — word
    bigrams under the shared tokenization law, hashed into the bounded
    feature space with the portable poly hash."""
    from raycdc import phash as H

    grams: list = []
    bounds = [0]
    for t in texts:
        toks = T.py_tokens(t)
        grams.extend(toks[i] + " " + toks[i + 1] for i in range(len(toks) - 1))
        bounds.append(len(grams))
    bk = (H.poly_hash(grams) % np.uint64(DSIR_BUCKETS)).astype(np.int64)
    return bk, np.asarray(bounds, dtype=np.int64)


def _dsir_stats(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    """Pass 1: (target bucket counts, corpus bucket counts). Target = the
    'val' bucket of the portable-hash split law (docs_split_assign), so
    the target distribution needs no side data. Per-batch partials are
    two bounded DSIR_BUCKETS-sized histograms — the driver fold moves
    O(blocks × buckets) ints, never a gram."""
    from raycdc import phash as H

    ds = C.read(sf_dir, "documents", ["doc_id", "text"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        bk, bounds = _dsir_bigrams(b["text"].to_numpy(dtype=object))
        h = H.poly_hash(
            b["doc_id"].astype("string").to_numpy(dtype=object)
        ) % np.uint64(_SPLIT_MOD)
        tgt = (h >= _SPLIT_TRAIN) & (h < _SPLIT_VAL)
        gm = np.repeat(tgt, np.diff(bounds))
        return pd.DataFrame(
            {
                "bucket": np.arange(DSIR_BUCKETS, dtype=np.int64),
                "t_n": np.bincount(bk[gm], minlength=DSIR_BUCKETS).astype(np.int64),
                "c_n": np.bincount(bk, minlength=DSIR_BUCKETS).astype(np.int64),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pandas")
        .to_pandas()
        .groupby("bucket")
        .sum()
        .reindex(range(DSIR_BUCKETS), fill_value=0)
    )
    return (
        agg["t_n"].to_numpy(dtype=np.int64),
        agg["c_n"].to_numpy(dtype=np.int64),
    )


def _dsir_lut_from_counts(t: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Integer log-ratio LUT (add-one smoothed), in 1e-4-nat units. The
    single float log runs ONCE here on exact integer inputs and the
    result is literal-shared into both engines (the BM25 idf discipline),
    so every per-doc fold downstream is integer-exact."""
    tot_t, tot_c = int(t.sum()), int(c.sum())
    lp = np.log((t + 1.0) / (tot_t + DSIR_BUCKETS))
    lq = np.log((c + 1.0) / (tot_c + DSIR_BUCKETS))
    return np.round(DSIR_SCALE * (lp - lq)).astype(np.int64)


def docs_dsir_weights(sf_dir: str):
    """DSIR importance weights (Xie et al., arXiv:2302.03169): score each
    document by how much more likely its hashed-bigram features are under
    the target distribution than under the raw corpus — the standard
    pretraining-data selection signal. Pass 1 estimates both unigram-of-
    bucket distributions from bounded per-batch histograms; the log-ratio
    LUT (the only float op) is computed once driver-side and broadcast;
    pass 2 scores every doc with one gather + segment-sum per batch. All
    per-doc arithmetic is integer — cross-engine hash-exact. The oracle
    recomputes the bucket statistics INDEPENDENTLY in SQL, so a drift in
    tokenization, hashing, or the split law surfaces as a LUT mismatch."""
    import ray

    lut = _dsir_lut_from_counts(*_dsir_stats(sf_dir))
    ref = C.broadcast(lut)
    ds = C.read(sf_dir, "documents", ["doc_id", "text"])

    def score(b: pd.DataFrame) -> pd.DataFrame:
        lut_ = ray.get(ref)
        bk, bounds = _dsir_bigrams(b["text"].to_numpy(dtype=object))
        s = C.segment_sum(lut_[bk], bounds)
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].astype("int64"),
                "n_bigrams": np.diff(bounds).astype("int64"),
                "dsir_score": s.astype("int64"),
            }
        )

    return ds.map_batches(score, batch_format="pandas")


_DSIR_BG_CTE = f"""
toks AS (
  SELECT doc_id, {T.toks_sql('text')} AS t FROM documents
), bg AS (
  SELECT doc_id,
         CASE WHEN len(t) < 2 THEN CAST([] AS VARCHAR[])
              ELSE [t[i] || ' ' || t[i+1]
                    for i in generate_series(1, len(t) - 1)]
         END AS g
  FROM toks
)"""


def _dsir_sql(sf_dir: str) -> str:
    """The DuckDB side derives the bucket statistics itself (unnested
    bigrams → poly hash → grouped counts, target = the split law on
    doc_id), then shares the identical literal LUT."""
    import duckdb

    from raycdc import phash as H

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    stats = con.execute(f"""
WITH {_DSIR_BG_CTE},
fl AS (SELECT doc_id, unnest(g) AS gram FROM bg),
hb AS (SELECT doc_id, {H.sql_poly('gram')} % {DSIR_BUCKETS} AS bucket FROM fl)
SELECT bucket, count(*) AS c_n,
       sum(CASE WHEN ({H.sql_poly("CAST(doc_id AS VARCHAR)")} % {_SPLIT_MOD})
                 BETWEEN {_SPLIT_TRAIN} AND {_SPLIT_VAL - 1}
                THEN 1 ELSE 0 END) AS t_n
FROM hb GROUP BY bucket
""").df()
    t = np.zeros(DSIR_BUCKETS, np.int64)
    c = np.zeros(DSIR_BUCKETS, np.int64)
    bidx = stats["bucket"].to_numpy(dtype=np.int64)
    t[bidx] = stats["t_n"].to_numpy(dtype=np.int64)
    c[bidx] = stats["c_n"].to_numpy(dtype=np.int64)
    lut_lit = "[" + ",".join(str(int(v)) for v in _dsir_lut_from_counts(t, c)) + "]"
    return f"""
WITH {_DSIR_BG_CTE},
h AS (
  SELECT doc_id,
         list_transform(g, x -> {H.sql_poly('x')} % {DSIR_BUCKETS}) AS bs
  FROM bg
)
SELECT doc_id, CAST(len(bs) AS BIGINT) AS n_bigrams,
       CAST(coalesce(list_sum(list_transform(bs, b -> ({lut_lit})[b + 1])), 0)
            AS BIGINT) AS dsir_score
FROM h ORDER BY doc_id
"""


# -- quality-filter funnel (FineWeb/Gopher-style cascade) -------------------

# (stage, name, ...) thresholds shared verbatim by the Ray kernel and the
# SQL oracle. Every rule is INTEGER-EXACT (ratios cross-multiplied), so
# there is no float to drift between engines.
FUNNEL_MIN_CHARS = 120
FUNNEL_MIN_WORDS = 25
FUNNEL_MWL_LO, FUNNEL_MWL_HI = 4, 5  # mean word length in [4, 5]
FUNNEL_STOP_PCT = 4  # stopword ratio >= 4%  (25*n_stop >= n_words)
FUNNEL_DISTINCT_NUM, FUNNEL_DISTINCT_DEN = 2, 5  # distinct/total >= 2/5
FUNNEL_STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "are",
)
FUNNEL_STAGES = (
    (1, "min_chars"), (2, "min_words"), (3, "mean_word_len"),
    (4, "stopword_ratio"), (5, "word_repetition"),
)


class _FunnelScorer:
    """Per-doc first-failing-filter stage (0 = passed every filter) →
    per-batch stage COUNTS. Regex compiled once per actor; all per-word
    stats run on ONE flat token series with segment folds (the
    QualityScorer pattern) — no per-row Python."""

    def __init__(self):
        self.word = re.compile(r"[a-zA-Z']+")
        # explicit ASCII class — never \\w/\\s, whose unicode semantics
        # differ between Python re and DuckDB RE2 (textkit's lesson)
        self.punct = re.compile(r"[^A-Za-z0-9_ \t\n]")
        self.stop = frozenset(FUNNEL_STOPWORDS)

    def stages(self, b: pd.DataFrame) -> tuple:
        """(first-failing stage per doc, word count per doc) — the shared
        verdict kernel of the counted funnel and the curation pipeline."""
        from itertools import chain

        texts = b["text"]
        n_chars = texts.str.len().to_numpy().astype("int64")
        words = texts.str.findall(self.word)
        counts = words.str.len().to_numpy().astype("int64")
        bounds = np.concatenate(([0], np.cumsum(counts)))
        flat = pd.Series(list(chain.from_iterable(words)), dtype="object")
        sum_len = C.segment_sum(
            flat.str.len().to_numpy().astype("int64"), bounds
        )
        n_stop = C.segment_sum(
            flat.isin(self.stop).to_numpy().astype("int64"), bounds
        )
        # distinct words per doc without per-row set(): doc-tagged flat
        # tokens → drop_duplicates → bincount
        doc_ix = np.repeat(np.arange(len(b)), counts)
        dd = pd.DataFrame({"d": doc_ix, "w": flat}).drop_duplicates()
        n_distinct = np.bincount(
            dd["d"].to_numpy(), minlength=len(b)
        ).astype("int64")

        stage = np.zeros(len(b), dtype=np.int64)
        nw = np.maximum(counts, 1)  # guards only stages already passed
        rules = [
            (1, n_chars < FUNNEL_MIN_CHARS),
            (2, counts < FUNNEL_MIN_WORDS),
            (3, (FUNNEL_MWL_LO * nw > sum_len) | (sum_len > FUNNEL_MWL_HI * nw)),
            (4, (100 // FUNNEL_STOP_PCT) * n_stop < nw),
            (5, FUNNEL_DISTINCT_DEN * n_distinct < FUNNEL_DISTINCT_NUM * nw),
        ]
        for s, fail in rules:
            stage = np.where((stage == 0) & fail, s, stage)
        return stage, counts

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        stage, _ = self.stages(b)
        u, c = np.unique(stage, return_counts=True)
        return pd.DataFrame({"stage": u.astype("int64"), "c": c.astype("int64")})


def docs_filter_funnel(sf_dir: str):
    """Quality-filter FUNNEL — the FineWeb/Gopher-style cascade every
    pretraining corpus goes through (Penedo et al. 2306.01116 §3; Rae et
    al. 2112.11446 Gopher rules), with FIRST-FAILING-FILTER attribution:
    each document is charged to the first filter that rejects it, and the
    result is one row per filter — (stage, filter, n_in, n_dropped,
    n_out) — so a pipeline owner can see which rule eats the corpus.
    Filters (fixed order): min chars, min words, mean word length band,
    stopword ratio, distinct-word repetition — all integer-exact
    (cross-multiplied ratios, no floats to drift vs the oracle).

    Scale shape: stateful actor pool scores batches (regex compiled once
    per actor), emits per-batch STAGE COUNTS (≤ 6 rows each) →
    ``groupby(stage).sum`` moves only those; the funnel assembly at the
    driver is O(stages). Reference analog: the export-filter chains of
    ``indexer/modules/custom/*`` jobs, recast as corpus curation."""
    ds = C.read(sf_dir, "documents", ["doc_id", "text"])
    agg = (
        ds.map_batches(_FunnelScorer, batch_format="pandas", concurrency=(1, 4))
        .groupby("stage")
        .sum("c")
        .take_all()
    )  # ≤ 6 rows — O(filters), never O(corpus)
    by_stage = {int(r["stage"]): int(r["sum(c)"]) for r in agg}
    total = sum(by_stage.values())
    rows, n_in = [], total
    for s, name in FUNNEL_STAGES:
        dropped = by_stage.get(s, 0)
        rows.append(
            {
                "stage": np.int64(s),
                "filter": name,
                "n_in": np.int64(n_in),
                "n_dropped": np.int64(dropped),
                "n_out": np.int64(n_in - dropped),
            }
        )
        n_in -= dropped
    return pd.DataFrame(rows)


class _CurationMap(_FunnelScorer):
    """Per-doc curation verdict: quality-funnel survivors only, with the
    columns the downstream dedup needs."""

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        stage, n_words = self.stages(b)
        keep = stage == 0
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].to_numpy()[keep].astype("int64"),
                "text": b["text"].to_numpy(dtype=object)[keep],
                "lang": b["lang"].to_numpy(dtype=object)[keep],
                "n_words": n_words[keep],
            }
        )


def docs_curation_pipeline(sf_dir: str):
    """The COMPOSED curation pipeline a pretraining-corpus owner actually
    runs, as one driver-checkable row: quality-filter cascade
    (``docs_filter_funnel``'s exact rules, survivors only) → exact dedup
    keep-first (min doc_id per surviving text) → the final kept corpus as
    (doc_id, lang, n_words). Composition is the point: the stages chain
    as one streaming Dataset — filter inside the scorer actor pool, then
    the bounded-partition dedup shuffle — with no materialization between
    them, and the oracle is the same two stages as SQL CTEs.

    Scale shape: one corpus pass (stateful scorer pool, survivors
    emitted in-batch), one bounded hash-of-text shuffle for the dedup
    winners (the ``dedup_exact`` pattern) — nothing corpus-sized lands
    on the driver."""
    ds = C.read(sf_dir, "documents", ["doc_id", "text", "lang"])
    nparts = C.join_partitions()
    survivors = ds.map_batches(
        _CurationMap, batch_format="pandas", concurrency=(1, 4)
    )

    def add_part(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        h = pd.util.hash_array(b["text"].to_numpy(dtype=object))
        b["part"] = (h % np.uint64(nparts)).astype("int32")
        return b

    def winners(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("text", as_index=False).agg(
            doc_id=("doc_id", "min"),
            lang=("lang", "min"),
            n_words=("n_words", "min"),
        )
        out["doc_id"] = out["doc_id"].astype("int64")
        out["n_words"] = out["n_words"].astype("int64")
        return out[["doc_id", "lang", "n_words"]]

    return (
        survivors.map_batches(add_part, batch_format="pandas")
        .groupby("part")
        .map_groups(winners, batch_format="pandas")
    )


def _curation_pipeline_sql() -> str:
    # the funnel's verdict CTE chain, re-keyed per doc and extended with
    # the dedup columns (same constants — one source of truth above)
    stop = ", ".join(f"'{w}'" for w in FUNNEL_STOPWORDS)
    inv_stop = 100 // FUNNEL_STOP_PCT
    return f"""
WITH m AS (
  SELECT doc_id, text, lang, length(text) AS n_chars,
         regexp_extract_all(text, '[a-zA-Z'']+') AS ws
  FROM documents
), m2 AS (
  SELECT doc_id, text, lang, n_chars, len(ws) AS n_words,
         CAST(coalesce(list_sum(list_transform(ws, w -> length(w))), 0)
              AS BIGINT) AS sum_len,
         CAST(coalesce(list_sum(list_transform(ws,
              w -> CASE WHEN w IN ({stop}) THEN 1 ELSE 0 END)), 0)
              AS BIGINT) AS n_stop,
         CAST(len(list_distinct(ws)) AS BIGINT) AS n_distinct
  FROM m
), verdict AS (
  SELECT doc_id, text, lang, CAST(n_words AS BIGINT) AS n_words, CASE
    WHEN n_chars < {FUNNEL_MIN_CHARS} THEN 1
    WHEN n_words < {FUNNEL_MIN_WORDS} THEN 2
    WHEN {FUNNEL_MWL_LO} * greatest(n_words, 1) > sum_len
      OR sum_len > {FUNNEL_MWL_HI} * greatest(n_words, 1) THEN 3
    WHEN {inv_stop} * n_stop < greatest(n_words, 1) THEN 4
    WHEN {FUNNEL_DISTINCT_DEN} * n_distinct
         < {FUNNEL_DISTINCT_NUM} * greatest(n_words, 1) THEN 5
    ELSE 0 END AS stage
  FROM m2
)
SELECT CAST(min(doc_id) AS BIGINT) AS doc_id, min(lang) AS lang,
       CAST(min(n_words) AS BIGINT) AS n_words
FROM verdict WHERE stage = 0 GROUP BY text
"""


def _filter_funnel_sql() -> str:
    stop = ", ".join(f"'{w}'" for w in FUNNEL_STOPWORDS)
    stages = ", ".join(f"({s}, '{n}')" for s, n in FUNNEL_STAGES)
    inv_stop = 100 // FUNNEL_STOP_PCT
    return f"""
WITH m AS (
  SELECT doc_id, length(text) AS n_chars,
         regexp_extract_all(text, '[a-zA-Z'']+') AS ws
  FROM documents
), m2 AS (
  SELECT doc_id, n_chars, len(ws) AS n_words,
         CAST(coalesce(list_sum(list_transform(ws, w -> length(w))), 0)
              AS BIGINT) AS sum_len,
         CAST(coalesce(list_sum(list_transform(ws,
              w -> CASE WHEN w IN ({stop}) THEN 1 ELSE 0 END)), 0)
              AS BIGINT) AS n_stop,
         CAST(len(list_distinct(ws)) AS BIGINT) AS n_distinct
  FROM m
), verdict AS (
  SELECT CASE
    WHEN n_chars < {FUNNEL_MIN_CHARS} THEN 1
    WHEN n_words < {FUNNEL_MIN_WORDS} THEN 2
    WHEN {FUNNEL_MWL_LO} * greatest(n_words, 1) > sum_len
      OR sum_len > {FUNNEL_MWL_HI} * greatest(n_words, 1) THEN 3
    WHEN {inv_stop} * n_stop < greatest(n_words, 1) THEN 4
    WHEN {FUNNEL_DISTINCT_DEN} * n_distinct
         < {FUNNEL_DISTINCT_NUM} * greatest(n_words, 1) THEN 5
    ELSE 0 END AS stage
  FROM m2
), cnt AS (SELECT stage, count(*) AS c FROM verdict GROUP BY stage),
stages(stage, filter) AS (VALUES {stages})
SELECT stage, filter, n_in, n_dropped,
       n_in - n_dropped AS n_out
FROM (
  SELECT s.stage, s.filter,
         CAST((SELECT count(*) FROM verdict v
               WHERE v.stage = 0 OR v.stage >= s.stage) AS BIGINT) AS n_in,
         CAST(coalesce((SELECT c FROM cnt WHERE cnt.stage = s.stage), 0)
              AS BIGINT) AS n_dropped
  FROM stages s
)
ORDER BY stage
"""


QUERIES = {
    "docs_filter_funnel": docs_filter_funnel,
    "dedup_exact": dedup_exact,
    "token_counts": token_counts,
    "lang_stats": lang_stats,
    "quality_scores": quality_scores,
    "lang_id": lang_id,
    "fingerprints": fingerprints,
    "doc_chunks": doc_chunks,
    "corpus_prep": corpus_prep,
    "vocab_top_terms": vocab_top_terms,
    "docs_stratified_sample": docs_stratified_sample,
    "docs_weighted_sample": docs_weighted_sample,
    "docs_lm_familiarity": docs_lm_familiarity,
    "tfidf_top_terms": tfidf_top_terms,
    "docs_split_assign": docs_split_assign,
    "doc_pack_offsets": doc_pack_offsets,
    "docs_contamination": docs_contamination,
    "docs_dup_spans": docs_dup_spans,
    "docs_dedup_cut": docs_dedup_cut,
    "docs_vocab_drift": docs_vocab_drift,
    "docs_distinct_ngrams": docs_distinct_ngrams,
    "docs_bpe_pairs": docs_bpe_pairs,
    "docs_curation_pipeline": docs_curation_pipeline,
    "docs_langid_confusion": docs_langid_confusion,
    "docs_freq_spectrum": docs_freq_spectrum,
    "docs_char_budget": docs_char_budget,
    "docs_length_clip": docs_length_clip,
    "docs_bm25_topk": docs_bm25_topk,
    "docs_dsir_weights": docs_dsir_weights,
    "token_counts_bpe": token_counts_bpe,
}


def build_docs_oracle_sql(sf_dir: str) -> dict[str, str]:
    """Tier-bound oracles: BM25 embeds idf/avgdl literals derived from
    ``sf_dir``'s corpus statistics (same pattern as the ANN oracles'
    trained-centroid literals)."""
    return {
        "docs_bm25_topk": _bm25_sql(sf_dir),
        "docs_dsir_weights": _dsir_sql(sf_dir),
    }

ORACLE_SQL = {
    "docs_filter_funnel": _filter_funnel_sql(),
    "dedup_exact": DEDUP_EXACT_SQL,
    "token_counts": TOKEN_COUNTS_SQL,
    "token_counts_bpe": TOKEN_COUNTS_BPE_SQL,
    "lang_stats": LANG_STATS_SQL,
    "quality_scores": QUALITY_SQL,
    "lang_id": LANG_ID_SQL,
    "fingerprints": _fingerprints_sql(),
    "doc_chunks": DOC_CHUNKS_SQL,
    "corpus_prep": _corpus_prep_sql(),
    "vocab_top_terms": VOCAB_SQL,
    "docs_stratified_sample": _strat_sample_sql(),
    "docs_weighted_sample": _wsample_sql(),
    "docs_lm_familiarity": LM_FAMILIARITY_SQL,
    "tfidf_top_terms": TFIDF_SQL,
    "docs_split_assign": _split_assign_sql(),
    "doc_pack_offsets": PACK_OFFSETS_SQL,
    "docs_contamination": _contamination_sql(),
    "docs_dup_spans": _dup_spans_sql(),
    "docs_dedup_cut": _dedup_cut_sql(),
    "docs_vocab_drift": _vocab_drift_sql(),
    "docs_distinct_ngrams": _distinct_ngrams_sql(),
    "docs_bpe_pairs": _bpe_pairs_sql(),
    "docs_curation_pipeline": _curation_pipeline_sql(),
    "docs_langid_confusion": _langid_confusion_sql(),
    "docs_freq_spectrum": _freq_spectrum_sql(),
    "docs_char_budget": _char_budget_sql(),
    "docs_length_clip": _length_clip_sql(),
}
