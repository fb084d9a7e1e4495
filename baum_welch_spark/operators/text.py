"""Text-analysis operators over the ``documents`` table (north-star §2.7):
language-ID heuristic, quality scoring, token statistics, document
fingerprinting. All pure Catalyst expressions (no UDFs) with DuckDB-portable
semantics, so every operator is oracle-checked.

Scale: each is an embarrassingly-parallel projection — no shuffle except the
final fingerprint clustering groupBy. At 100 TB these run at scan speed with
full column pruning (only ``doc_id``/``text`` are read).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# marker stopwords per language for the n-gram/stopword language heuristic.
# Evaluation is purely frequency-of-marker-words — deterministic and portable.
LANG_MARKERS = {
    "en": ["the", "a", "of", "and"],
    "de": ["der", "die", "und", "das"],
    "fr": ["le", "la", "et", "les"],
    "es": ["el", "la", "y", "los"],
}

STOPWORDS = ["the", "a", "of", "and", "to", "in"]


def _words(col: str = "text"):
    # the package's canonical lowercased whitespace tokenizer
    from baum_welch_spark.functions.columns import words

    return words(col)


def token_stats(documents: DataFrame) -> DataFrame:
    """Token counting: whitespace tokens, distinct tokens, type-token ratio."""
    w = _words()
    return documents.select(
        "doc_id",
        F.size(w).alias("n_tokens"),
        F.size(F.array_distinct(w)).alias("n_distinct"),
        F.round(F.size(F.array_distinct(w)) / F.size(w), 6).alias("type_token_ratio"),
    )


TOKEN_STATS_SQL = """
SELECT doc_id,
       len(string_split(lower(text), ' ')) AS n_tokens,
       len(list_distinct(string_split(lower(text), ' '))) AS n_distinct,
       round(len(list_distinct(string_split(lower(text), ' '))) * 1.0
             / len(string_split(lower(text), ' ')), 6) AS type_token_ratio
FROM documents
"""


def doc_quality(documents: DataFrame) -> DataFrame:
    """Quality scoring: length, word count, mean word length, stopword ratio.

    The quality score is a deterministic linear blend of the usual corpus
    heuristics (length band + stopword presence), the shape used to filter
    LLM training text.
    """
    w = _words()
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_words = F.size(w)
    n_stop = F.size(F.filter(w, lambda x: F.array_contains(stop_arr, x)))
    return documents.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        n_words.alias("n_words"),
        F.round((F.length("text") - n_words + 1) / n_words, 6).alias("avg_word_len"),
        F.round(n_stop / n_words, 6).alias("stopword_ratio"),
        F.round(
            F.when((F.length("text") >= 100) & (F.length("text") <= 2000), 0.5).otherwise(0.0)
            + F.when(n_stop / n_words > 0.02, 0.5).otherwise(0.0),
            1,
        ).alias("quality_score"),
    )


DOC_QUALITY_SQL = f"""
WITH base AS (
  SELECT doc_id, text,
         length(text) AS n_chars,
         len(string_split(lower(text), ' ')) AS n_words,
         len(list_filter(string_split(lower(text), ' '),
             x -> x IN ({", ".join("'" + s + "'" for s in STOPWORDS)}))) AS n_stop
  FROM documents
)
SELECT doc_id, n_chars, n_words,
       round((n_chars - n_words + 1) * 1.0 / n_words, 6) AS avg_word_len,
       round(n_stop * 1.0 / n_words, 6) AS stopword_ratio,
       round(CASE WHEN n_chars BETWEEN 100 AND 2000 THEN 0.5 ELSE 0.0 END
             + CASE WHEN n_stop * 1.0 / n_words > 0.02 THEN 0.5 ELSE 0.0 END, 1) AS quality_score
FROM base
"""


def lang_id(documents: DataFrame) -> DataFrame:
    """Stopword-marker language ID: score = count of language marker words;
    argmax with deterministic tiebreak by language code order."""
    w = _words()

    def marker_score(lang: str):
        markers = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
        return F.size(F.filter(w, lambda x: F.array_contains(markers, x))).alias(f"score_{lang}")

    scores = [marker_score(lang) for lang in sorted(LANG_MARKERS)]
    scored = documents.select("doc_id", "lang", *scores)
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{c}") for c in langs])
    expr = None
    for c in langs:  # first language (alphabetical) hitting the max wins
        cond = F.col(f"score_{c}") == best
        expr = F.when(cond, c) if expr is None else expr.when(cond, c)
    return scored.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        expr.alias("pred_lang"),
        best.alias("best_score"),
    )


def _lang_sql_scores() -> str:
    parts = []
    for lang in sorted(LANG_MARKERS):
        markers = ", ".join(f"'{m}'" for m in LANG_MARKERS[lang])
        parts.append(
            f"len(list_filter(string_split(lower(text), ' '), x -> x IN ({markers}))) AS score_{lang}"
        )
    return ",\n         ".join(parts)


LANG_ID_SQL = f"""
WITH scored AS (
  SELECT doc_id, lang,
         {_lang_sql_scores()}
  FROM documents
)
SELECT doc_id, lang AS labeled_lang,
       CASE {' '.join(f"WHEN score_{c} = greatest(score_de, score_en, score_es, score_fr) THEN '{c}'" for c in sorted(LANG_MARKERS))}
       END AS pred_lang,
       greatest(score_de, score_en, score_es, score_fr) AS best_score
FROM scored
"""


def fingerprint(documents: DataFrame) -> DataFrame:
    """Canonical document fingerprint: sorted distinct lowercase words joined
    by space (the classic key-collision fingerprint for fuzzy dedup)."""
    return documents.select(
        "doc_id",
        F.array_join(F.array_sort(F.array_distinct(_words())), " ").alias("fp"),
    )


FINGERPRINT_SQL = """
SELECT doc_id,
       array_to_string(list_sort(list_distinct(string_split(lower(text), ' '))), ' ') AS fp
FROM documents
"""


BPE_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def bpe_token_stats(documents: DataFrame) -> DataFrame:
    """BPE-ish tokenization stats: GPT-style pre-tokenizer approximation
    (letter runs | single digits | punctuation marks) via regexp_extract_all
    — the unit a byte-pair vocabulary would start merging from. Both Java
    and RE2 regex agree on this character-class-only pattern, so the DuckDB
    oracle is exact. Pure codegen projection, shuffle-free."""
    # F.lit pattern, not an F.expr SQL literal: SQL string escaping would
    # swallow the backslash in \s and make spaces match the negated class
    toks = F.regexp_extract_all(F.col("text"), F.lit(BPE_PATTERN), F.lit(0))
    ws = F.split(F.col("text"), r"\s+")
    return documents.select(
        "doc_id",
        F.size(toks).alias("n_bpe_tokens"),
        F.size(ws).alias("n_ws_tokens"),
        F.round(F.size(toks) / F.size(ws), 6).alias("fertility"),
    )


BPE_TOKEN_STATS_SQL = r"""
SELECT doc_id,
       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS n_bpe_tokens,
       len(regexp_split_to_array(text, '\s+')) AS n_ws_tokens,
       round(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) * 1.0
             / len(regexp_split_to_array(text, '\s+')), 6) AS fertility
FROM documents
"""
