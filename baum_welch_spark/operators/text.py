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


def winnow_fingerprints(documents: DataFrame, k: int = 8, w: int = 4) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson, Aiken 2003 —
    the MOSS local-fingerprinting algorithm): hash every ``k``-char gram,
    then keep the MINIMUM hash of each window of ``w`` consecutive grams.
    Winnowing guarantees any shared substring of length >= k + w - 1
    produces at least one shared fingerprint, at ~1/w the density of full
    k-gram shingling — the standard copy-span detector (plagiarism /
    license-text / boilerplate) where whole-doc MinHash is too coarse.

    Whole-stage-codegen throughout: grams and window minima are
    ``transform``/``slice``/``array_min`` over ``sequence`` — no Python,
    no shuffle before the final per-doc explode. Hashes use
    ``portable_hash60`` so the DuckDB oracle reproduces them bit-for-bit.

    Output: (doc_id, fp) unique per doc, UNORDERED — a doc's fingerprint
    set. Rows are unique because fps is array_distinct'd per doc; no global
    distinct/sort tail because the driver's value hash is order-insensitive
    and the old tail cost two full shuffles of the fingerprint stream.
    """
    from baum_welch_spark.functions.columns import portable_hash60

    t = F.col("text")
    n = F.length(t)
    grams = F.transform(
        F.sequence(F.lit(1), n - k + 1),
        lambda i: portable_hash60(t.substr(i, F.lit(k))),
    )
    # grams MUST be projected before the window pass: inlining the
    # expression into the slice lambda would splice the whole gram-hash
    # subtree into EVERY window element, re-hashing the document once per
    # window (O(len^2) md5 calls; measured as a >100x slowdown)
    g = F.col("_grams")
    fps = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size(g) - w + 1),
            lambda j: F.array_min(F.slice(g, j, w)),
        )
    )
    # no .distinct()/.orderBy() tail: fps is already array_distinct per doc
    # (so the exploded rows are unique) and the driver's value hash is
    # order-insensitive — the old distinct+sort tail was two full shuffles
    # of the fingerprint stream for nothing
    return (
        documents.filter(n >= k + w - 1)
        .withColumn("_grams", grams)
        .select("doc_id", F.explode(fps).alias("fp"))
    )


def winnow_fingerprints_sql(k: int = 8, w: int = 4) -> str:
    """DuckDB oracle generated from the SAME k/w (face/oracle no-drift
    convention). range() is end-exclusive; list slicing is 1-based
    inclusive; the md5-prefix hash mirrors ``portable_hash60``."""
    return f"""
WITH grams AS (
  SELECT doc_id,
         list_transform(range(1, length(text) - {k} + 2),
                        i -> ('0x' || substr(md5(substr(text, i::INTEGER, {k})), 1, 15))::BIGINT) AS g,
         length(text) AS n
  FROM documents
  WHERE length(text) >= {k} + {w} - 1
),
fps AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, n - {k} - {w} + 3),
                                      j -> list_min(g[j::INTEGER : j::INTEGER + {w} - 1]))) AS f
  FROM grams
)
SELECT DISTINCT doc_id, fp
FROM fps, UNNEST(f) AS u(fp)
ORDER BY doc_id, fp
"""


WINNOW_FINGERPRINTS_SQL = winnow_fingerprints_sql()


def copy_pairs(
    documents: DataFrame, k: int = 8, w: int = 4, min_shared: int = 8, max_df: int = 25
) -> DataFrame:
    """Copy-span candidate pairs: documents sharing >= ``min_shared``
    winnowing fingerprints, after dropping boilerplate fingerprints that
    appear in more than ``max_df`` documents (ubiquitous grams would
    otherwise pair everything with everything — the hot-bucket guard, same
    role as the LSH bucket cap).

    Scale posture: pairs come BY FINGERPRINT (grouped doc lists + codegen
    pair explode — the dedup-suite bucket-join shape), never all-pairs, and
    the df cap and pair generation are ONE aggregation over one shuffle
    (the agg-then-self-join form needed two, and relied on Spark's
    ReusedExchange to avoid re-evaluating the winnowing pipeline). A
    fingerprint's pair array is bounded by max_df^2/2 structs. Output is
    (doc_a, doc_b, shared) ordered.
    """
    from baum_welch_spark.functions.columns import pair_structs

    fps = winnow_fingerprints(documents, k=k, w=w)
    lists = (
        fps.groupBy("fp")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ds"))
        .filter((F.size("ds") > 1) & (F.size("ds") <= max_df))
    )
    return (
        lists.select(F.explode(pair_structs("ds")).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= min_shared)
        .orderBy("doc_a", "doc_b")
    )


def copy_pairs_sql(k: int = 8, w: int = 4, min_shared: int = 8, max_df: int = 25) -> str:
    """DuckDB oracle for :func:`copy_pairs`, generated from the same
    parameters."""
    return f"""
WITH fps AS ({winnow_fingerprints_sql(k, w).strip().rstrip()}),
df_ok AS (
  SELECT fp FROM fps GROUP BY fp HAVING count(*) <= {max_df}
),
pruned AS (SELECT f.doc_id, f.fp FROM fps f JOIN df_ok USING (fp))
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
FROM pruned a JOIN pruned b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
HAVING count(*) >= {min_shared}
ORDER BY doc_a, doc_b
"""


COPY_PAIRS_SQL = copy_pairs_sql()
