"""Text-analysis operators over the ``documents`` table (north-star §2.7):
language-ID heuristic, quality scoring, token statistics, document
fingerprinting. All pure Catalyst expressions (no UDFs) with DuckDB-portable
semantics, so every operator is oracle-checked.

Scale: each is an embarrassingly-parallel projection — no shuffle except the
final fingerprint clustering groupBy. At 100 TB these run at scan speed with
full column pruning (only ``doc_id``/``text`` are read).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
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


def quality_score_col():
    """The quality_score expression as a Column over a ``text`` column —
    the single source of truth shared by :func:`doc_quality` and the
    corpus gates (r15: ``clean_corpus`` applies it as a map-side FILTER on
    the corpus scan instead of a semi-join against a separately-scanned
    doc_quality projection — one less corpus scan and one less join,
    bit-identical values because it is literally the same expression)."""
    w = _words()
    n_words = F.size(w)
    n_stop = _n_stop(w)
    return F.round(
        F.when((F.length("text") >= 100) & (F.length("text") <= 2000), 0.5).otherwise(0.0)
        + F.when(n_stop / n_words > 0.02, 0.5).otherwise(0.0),
        1,
    )


def _n_stop(w):
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    return F.size(F.filter(w, lambda x: F.array_contains(stop_arr, x)))


def doc_quality(documents: DataFrame) -> DataFrame:
    """Quality scoring: length, word count, mean word length, stopword ratio.

    The quality score is a deterministic linear blend of the usual corpus
    heuristics (length band + stopword presence), the shape used to filter
    LLM training text.
    """
    w = _words()
    n_words = F.size(w)
    n_stop = _n_stop(w)
    return documents.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        n_words.alias("n_words"),
        F.round((F.length("text") - n_words + 1) / n_words, 6).alias("avg_word_len"),
        F.round(n_stop / n_words, 6).alias("stopword_ratio"),
        quality_score_col().alias("quality_score"),
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


def _spread_for_extraction(documents: DataFrame) -> DataFrame:
    """Guard for the CPU-heavy winnowing projections: a small parquet input
    scans as ONE partition (maxPartitionBytes never splits a small file),
    which serializes the per-char md5 gram pass onto a single core — the
    scan-time cousin of the neardup_edit AQE-coalesce bug (input BYTES are
    tiny relative to extraction CPU; measured 7.8 s -> 1.1 s at sf0.1).
    Repartition to cluster parallelism ONLY when the scan's file count is
    below it — a 100 TB corpus already arrives in thousands of splits and
    must not eat an unconditional full-corpus shuffle."""
    spark = documents.sparkSession
    parts = spark.sparkContext.defaultParallelism
    try:
        few = len(documents.inputFiles()) < max(1, parts // 2)
    except Exception:
        # non-file-backed frame (in-memory/view): consult Catalyst's byte
        # estimate instead of assuming small — a large cached corpus must
        # not eat an unconditional full-corpus shuffle just because it has
        # no input files. Below ~1 GiB the spread is cheap relative to the
        # extraction CPU it parallelizes; above, the frame already has (or
        # deserves) real partitioning upstream.
        try:
            size = int(
                documents._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
            )
        except Exception:
            size = 0  # stats unavailable: treat as small (tests), spread
        few = size < (1 << 30)
    return documents.repartition(parts, "doc_id") if few else documents


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
        _spread_for_extraction(documents.filter(n >= k + w - 1))
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


def winnow_fingerprint_positions(
    documents: DataFrame, k: int = 8, w: int = 4
) -> DataFrame:
    """Positional winnowing: (doc_id, fp, pos) with ``pos`` the 1-based char
    offset of the selected minimum gram in each window (FIRST occurrence of
    the window minimum — the deterministic tiebreak both engines share).
    The positional variant of :func:`winnow_fingerprints`, needed when the
    question is WHERE the copy sits, not just whether one exists
    (Schleimer/Wilkerson/Aiken 2003 record (hash, position) pairs for
    exactly this reason). Unique (doc_id, fp, pos) rows, unordered — the
    per-doc ``array_distinct`` over (fp, pos) structs makes the exploded
    rows unique already, so there is deliberately NO global ``.distinct()``
    tail (it would be one full shuffle of the fingerprint stream for
    nothing — the winnow_fingerprints lesson). Same pure-codegen shape (the
    _grams projection trap applies here too, and the window MINIMA are
    projected before the position pass for the same reason — inlining
    ``array_min(slice(...))`` into the ``array_position`` lambda would
    re-evaluate the min subtree per window)."""
    from baum_welch_spark.functions.columns import portable_hash60

    t = F.col("text")
    n = F.length(t)
    grams = F.transform(
        F.sequence(F.lit(1), n - k + 1),
        lambda i: portable_hash60(t.substr(i, F.lit(k))),
    )
    g = F.col("_grams")
    mins = F.transform(
        F.sequence(F.lit(1), F.size(g) - w + 1),
        lambda j: F.array_min(F.slice(g, j, w)),
    )
    m = F.col("_mins")
    win = F.transform(
        F.sequence(F.lit(1), F.size(m)),
        lambda j: F.struct(
            F.element_at(m, j).alias("fp"),
            (j + F.array_position(F.slice(g, j, w), F.element_at(m, j)) - 1)
            .cast("bigint")
            .alias("pos"),
        ),
    )
    return (
        _spread_for_extraction(documents.filter(n >= k + w - 1))
        .withColumn("_grams", grams)
        .withColumn("_mins", mins)
        .select("doc_id", F.explode(F.array_distinct(win)).alias("m"))
        .select("doc_id", "m.fp", "m.pos")
    )


def copy_spans(
    documents: DataFrame,
    k: int = 8,
    w: int = 4,
    min_shared: int = 8,
    max_df: int = 25,
    gap: int = 16,
) -> DataFrame:
    """Copy-SPAN localization: for every qualifying copy pair (the
    :func:`copy_pairs` criterion — >= ``min_shared`` shared winnowing
    fingerprints after the df cap), the matched char intervals in doc_a:
    matched fingerprint positions sorted and merged whenever consecutive
    positions are <= ``gap`` chars apart; each merged run becomes one span
    (span_start, span_end = last_pos + k - 1, n_fps). This is what a
    dedup/redaction pipeline actually consumes — WHICH bytes to drop or
    attribute, not just which documents correlate (quote extraction,
    license-header stripping, contamination span removal).

    Scale posture: one winnowing scan feeds BOTH the df cap and the pair
    stage (single positional fingerprint frame); pairs come by fingerprint
    (bucket-join pair explode, df-capped at max_df^2/2 structs); span
    merging is two windows over (doc_a, doc_b) — the classic
    gaps-and-islands shape, partitioned by pair, never global. Shuffles:
    fp groupBy, pair window, position join, span window — all keyed,
    all bounded by matched-fingerprint volume.
    """
    from baum_welch_spark.functions.columns import pair_structs

    # materialized once (r14 optimization round, guide §3.3): the positional
    # fingerprint frame feeds BOTH the df-cap/pair stage and the position
    # join below — without the checkpoint Catalyst inlines the whole
    # winnowing scan (k-gram hash + two windows over the corpus) per
    # consumer, so "one winnowing scan" was only true of the source text
    fpp = winnow_fingerprint_positions(documents, k=k, w=w).localCheckpoint(
        eager=False
    )
    docfp = fpp.select("doc_id", "fp").distinct()
    lists = (
        docfp.groupBy("fp")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ds"))
        .filter((F.size("ds") > 1) & (F.size("ds") <= max_df))
    )
    pairs = lists.select(
        F.col("fp"), F.explode(pair_structs("ds")).alias("p")
    ).select("fp", "p.doc_a", "p.doc_b")
    wp = Window.partitionBy("doc_a", "doc_b")
    qual = pairs.withColumn("shared", F.count(F.lit(1)).over(wp)).filter(
        F.col("shared") >= min_shared
    )
    matches = qual.join(
        fpp.select(F.col("doc_id").alias("doc_a"), "fp", F.col("pos").alias("pos_a")),
        ["doc_a", "fp"],
    ).select("doc_a", "doc_b", "pos_a").distinct()
    ws = Window.partitionBy("doc_a", "doc_b").orderBy("pos_a")
    flagged = matches.withColumn(
        "new_span",
        F.when(
            F.col("pos_a") - F.lag("pos_a").over(ws) > F.lit(gap), 1
        ).otherwise(0),
    ).withColumn("span_id", F.sum("new_span").over(ws))
    return (
        flagged.groupBy("doc_a", "doc_b", "span_id")
        .agg(
            F.min("pos_a").alias("span_start"),
            (F.max("pos_a") + F.lit(k - 1)).cast("bigint").alias("span_end"),
            F.count(F.lit(1)).alias("n_fps"),
        )
        .select("doc_a", "doc_b", "span_start", "span_end", "n_fps")
    )


def copy_spans_sql(
    k: int = 8, w: int = 4, min_shared: int = 8, max_df: int = 25, gap: int = 16
) -> str:
    """DuckDB oracle for :func:`copy_spans`, generated from the same
    parameters (face/oracle no-drift convention). Mirrors the Spark shape:
    positional winnowing -> df cap -> qualifying pairs -> matched doc_a
    positions -> gaps-and-islands span merge."""
    return f"""
WITH grams AS (
  SELECT doc_id,
         list_transform(range(1, length(text) - {k} + 2),
                        i -> ('0x' || substr(md5(substr(text, i::INTEGER, {k})), 1, 15))::BIGINT) AS g,
         length(text) AS n
  FROM documents
  WHERE length(text) >= {k} + {w} - 1
),
wins AS (
  SELECT doc_id,
         list_transform(range(1, n - {k} - {w} + 3),
                        j -> struct_pack(
                          fp := list_min(g[j::INTEGER : j::INTEGER + {w} - 1]),
                          pos := (j + list_position(g[j::INTEGER : j::INTEGER + {w} - 1],
                                                    list_min(g[j::INTEGER : j::INTEGER + {w} - 1])) - 1)::BIGINT
                        )) AS ms
  FROM grams
),
fpp AS (
  SELECT DISTINCT doc_id, m.fp AS fp, m.pos AS pos
  FROM wins, UNNEST(ms) AS t(m)
),
docfp AS (SELECT DISTINCT doc_id, fp FROM fpp),
df_ok AS (SELECT fp FROM docfp GROUP BY fp HAVING count(*) > 1 AND count(*) <= {max_df}),
pruned AS (SELECT d.doc_id, d.fp FROM docfp d JOIN df_ok USING (fp)),
pairs AS (
  SELECT a.fp, a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM pruned a JOIN pruned b ON a.fp = b.fp AND a.doc_id < b.doc_id
),
qual AS (
  SELECT fp, doc_a, doc_b
  FROM (SELECT fp, doc_a, doc_b,
               count(*) OVER (PARTITION BY doc_a, doc_b) AS shared
        FROM pairs) t
  WHERE shared >= {min_shared}
),
matches AS (
  SELECT DISTINCT q.doc_a, q.doc_b, f.pos AS pos_a
  FROM qual q JOIN fpp f ON f.doc_id = q.doc_a AND f.fp = q.fp
),
flagged AS (
  SELECT doc_a, doc_b, pos_a,
         CASE WHEN pos_a - lag(pos_a) OVER (PARTITION BY doc_a, doc_b ORDER BY pos_a) > {gap}
              THEN 1 ELSE 0 END AS new_span
  FROM matches
),
spans AS (
  SELECT doc_a, doc_b, pos_a,
         sum(new_span) OVER (PARTITION BY doc_a, doc_b ORDER BY pos_a
                             ROWS UNBOUNDED PRECEDING) AS span_id
  FROM flagged
)
SELECT doc_a, doc_b,
       min(pos_a) AS span_start,
       (max(pos_a) + {k - 1})::BIGINT AS span_end,
       count(*) AS n_fps
FROM spans
GROUP BY doc_a, doc_b, span_id
"""


COPY_SPANS_SQL = copy_spans_sql()


def decontaminate_spans(
    documents: DataFrame,
    eval_mod: int = 50,
    k: int = 8,
    w: int = 4,
    gap: int = 16,
    min_fps: int = 2,
) -> DataFrame:
    """Span-level benchmark decontamination: the char intervals of each
    TRAINING document that match the held-out eval set's winnowing
    fingerprints (eval docs = the corpus.decontaminate convention,
    ``doc_id % eval_mod == 0``; in production the eval side is the
    benchmark suite). Where ``corpus.decontaminate`` answers "is this doc
    contaminated", this answers "which bytes" — the input a surgical
    span-removal pass needs (dropping whole documents over one leaked
    paragraph wastes the rest of the doc).

    Spans with fewer than ``min_fps`` matched fingerprints are dropped
    (a single chance 8-gram collision is noise; a real leaked span of
    length >= k + w - 1 + gap yields several).

    Scale posture: the eval fingerprint set is typically benchmark-sized,
    but here it is DERIVED FROM THE CORPUS (doc_id % eval_mod), so its size
    scales with the input — the exact parameterization-dependent class
    whose forced broadcast stalled decontaminate on the 100x board
    (corpus.py:201, VERDICT r12). No hint: AQE sizes the build side from
    the measured distinct-fp count and broadcasts only when it fits; the
    100 TB posture (benchmark-sized eval set -> map-side join) falls out
    at runtime instead of being asserted at plan time. The only keyed
    shuffle is the per-doc gaps-and-islands span window.
    Output: (doc_id, span_start, span_end, n_fps).
    """
    fpp = winnow_fingerprint_positions(documents, k=k, w=w)
    is_eval = F.col("doc_id") % eval_mod == 0
    eval_fps = fpp.filter(is_eval).select("fp").distinct()
    matches = (
        fpp.filter(~is_eval)
        .join(eval_fps, "fp")
        .select("doc_id", "pos")
        .distinct()
    )
    ws = Window.partitionBy("doc_id").orderBy("pos")
    flagged = matches.withColumn(
        "new_span",
        F.when(F.col("pos") - F.lag("pos").over(ws) > F.lit(gap), 1).otherwise(0),
    ).withColumn("span_id", F.sum("new_span").over(ws))
    return (
        flagged.groupBy("doc_id", "span_id")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(k - 1)).cast("bigint").alias("span_end"),
            F.count(F.lit(1)).alias("n_fps"),
        )
        .filter(F.col("n_fps") >= min_fps)
        .select("doc_id", "span_start", "span_end", "n_fps")
    )


def decontaminate_spans_sql(
    eval_mod: int = 50, k: int = 8, w: int = 4, gap: int = 16, min_fps: int = 2
) -> str:
    """DuckDB oracle for :func:`decontaminate_spans`, generated from the
    same parameters."""
    return f"""
WITH grams AS (
  SELECT doc_id,
         list_transform(range(1, length(text) - {k} + 2),
                        i -> ('0x' || substr(md5(substr(text, i::INTEGER, {k})), 1, 15))::BIGINT) AS g,
         length(text) AS n
  FROM documents
  WHERE length(text) >= {k} + {w} - 1
),
wins AS (
  SELECT doc_id,
         list_transform(range(1, n - {k} - {w} + 3),
                        j -> struct_pack(
                          fp := list_min(g[j::INTEGER : j::INTEGER + {w} - 1]),
                          pos := (j + list_position(g[j::INTEGER : j::INTEGER + {w} - 1],
                                                    list_min(g[j::INTEGER : j::INTEGER + {w} - 1])) - 1)::BIGINT
                        )) AS ms
  FROM grams
),
fpp AS (
  SELECT DISTINCT doc_id, m.fp AS fp, m.pos AS pos
  FROM wins, UNNEST(ms) AS t(m)
),
eval_fps AS (SELECT DISTINCT fp FROM fpp WHERE doc_id % {eval_mod} = 0),
matches AS (
  SELECT DISTINCT f.doc_id, f.pos
  FROM fpp f JOIN eval_fps e USING (fp)
  WHERE f.doc_id % {eval_mod} <> 0
),
flagged AS (
  SELECT doc_id, pos,
         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > {gap}
              THEN 1 ELSE 0 END AS new_span
  FROM matches
),
spans AS (
  SELECT doc_id, pos,
         sum(new_span) OVER (PARTITION BY doc_id ORDER BY pos
                             ROWS UNBOUNDED PRECEDING) AS span_id
  FROM flagged
)
SELECT doc_id, min(pos) AS span_start, (max(pos) + {k - 1})::BIGINT AS span_end,
       count(*) AS n_fps
FROM spans
GROUP BY doc_id, span_id
HAVING count(*) >= {min_fps}
"""


DECONTAMINATE_SPANS_SQL = decontaminate_spans_sql()
