"""Document-quality operators for LLM training-data curation: repetition
statistics (Gopher-style filters), PII redaction, and corpus-wide exact line
deduplication (the CCNet preprocessing step).

The reference has no text surface at all (SURVEY §2.5 — int/double
arithmetic only); these are north-star §2.7 extensions, implemented like the
rest of the text suite: pure Catalyst expressions with DuckDB-portable
semantics so every operator is oracle-checked exactly.

Scale posture (100 TB corpus):

- ``repetition_stats`` — three combinable groupBys keyed by
  (doc_id, ngram) / (doc_id, token, run): map-side partial aggregation
  collapses each doc's n-gram instances before the shuffle, and every key is
  doc-prefixed, so there are no corpus-wide hot keys by construction.
- ``pii_redact`` — an embarrassingly-parallel projection (regex inside
  whole-stage codegen); runs at scan speed, no shuffle.
- ``line_dedup`` — first-occurrence selection is a combinable
  ``min(encoded position)`` per line, NOT a window over the line key: a
  boilerplate line duplicated 10^9 times partial-aggregates to one row per
  map task instead of piling 10^9 rows into one window partition. The only
  skew-prone stage left is the equi-join back on the line string, which AQE
  splits if a single line dominates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# -- repetition statistics ---------------------------------------------------

#: a doc fails the repetition gate when its most common bigram covers more
#: than this fraction of bigram instances (Gopher's top-2-gram rule shape)
TOP_BIGRAM_MAX = 0.18
#: ... or when any single token repeats consecutively more than this
MAX_RUN_MAX = 3


def _words(col: str = "text"):
    from baum_welch_spark.functions.columns import words

    return words(col)


def repetition_stats(documents: DataFrame) -> DataFrame:
    """Per-document repetition metrics — the Gopher/MassiveText repetition
    filters used to drop template/spam pages from LLM training corpora:

    - ``top_bigram_frac``: instances of the doc's most frequent bigram over
      all bigram instances (0.0 for docs with < 2 tokens),
    - ``dup_trigram_frac``: fraction of trigram instances whose trigram
      occurs more than once in the doc (0.0 for docs with < 3 tokens),
    - ``max_token_run``: longest run of identical consecutive tokens
      (gaps-and-islands),
    - ``pass_repetition``: the combined gate at the module thresholds.

    Output: (doc_id, n_tokens, top_bigram_frac, dup_trigram_frac,
    max_token_run, pass_repetition), one row per document.
    """
    ws = F.col("ws")
    base = documents.select("doc_id", _words().alias("ws"))
    n_tok = base.select("doc_id", F.size(ws).alias("n_tokens"))

    def ngram_rows(n: int, out: str) -> DataFrame:
        idx = F.sequence(F.lit(0), F.size(ws) - n)
        grams = F.transform(
            idx, lambda i: F.concat_ws(" ", *[F.element_at(ws, i + j + 1) for j in range(n)])
        )
        return (
            base.where(F.size(ws) >= n)
            .select("doc_id", F.explode(grams).alias(out))
            .groupBy("doc_id", out)
            .agg(F.count(F.lit(1)).alias("cnt"))
        )

    bg = (
        ngram_rows(2, "g")
        .groupBy("doc_id")
        .agg((F.max("cnt") / F.sum("cnt")).alias("top_bigram_frac"))
    )
    tg = (
        ngram_rows(3, "g")
        .groupBy("doc_id")
        .agg(
            (F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(0)) / F.sum("cnt")).alias(
                "dup_trigram_frac"
            )
        )
    )
    # longest identical-token run: island id = pos - rank-of-pos within
    # (doc, token); consecutive positions of one token share an island
    toks = base.select("doc_id", F.posexplode(ws).alias("pos", "tok"))
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id", "tok").orderBy("pos")
    runs = (
        toks.withColumn("isl", F.col("pos") - F.row_number().over(w))
        .groupBy("doc_id", "tok", "isl")
        .agg(F.count(F.lit(1)).alias("run"))
        .groupBy("doc_id")
        .agg(F.max("run").alias("max_token_run"))
    )
    tbf = F.coalesce(F.col("top_bigram_frac"), F.lit(0.0))
    dtf = F.coalesce(F.col("dup_trigram_frac"), F.lit(0.0))
    return (
        n_tok.join(bg, "doc_id", "left")
        .join(tg, "doc_id", "left")
        .join(runs, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.round(tbf, 6).alias("top_bigram_frac"),
            F.round(dtf, 6).alias("dup_trigram_frac"),
            F.coalesce(F.col("max_token_run"), F.lit(0)).cast("bigint").alias("max_token_run"),
            ((tbf <= TOP_BIGRAM_MAX) & (F.coalesce(F.col("max_token_run"), F.lit(0)) <= MAX_RUN_MAX))
            .alias("pass_repetition"),
        )
    )


REPETITION_STATS_SQL = f"""
WITH base AS (
  SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents
),
ntok AS (SELECT doc_id, len(ws) AS n_tokens FROM base),
bg_rows AS (
  SELECT doc_id, ws[g] || ' ' || ws[g+1] AS g, count(*) AS cnt
  FROM base, unnest(generate_series(1, len(ws) - 1)) AS t(g)
  WHERE len(ws) >= 2 GROUP BY doc_id, ws[g] || ' ' || ws[g+1]
),
bg AS (SELECT doc_id, max(cnt) * 1.0 / sum(cnt) AS top_bigram_frac FROM bg_rows GROUP BY doc_id),
tg_rows AS (
  SELECT doc_id, ws[g] || ' ' || ws[g+1] || ' ' || ws[g+2] AS g, count(*) AS cnt
  FROM base, unnest(generate_series(1, len(ws) - 2)) AS t(g)
  WHERE len(ws) >= 3 GROUP BY doc_id, ws[g] || ' ' || ws[g+1] || ' ' || ws[g+2]
),
tg AS (
  SELECT doc_id,
         sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) * 1.0 / sum(cnt) AS dup_trigram_frac
  FROM tg_rows GROUP BY doc_id
),
toks AS (
  SELECT doc_id, g - 1 AS pos, ws[g] AS tok
  FROM base, unnest(generate_series(1, len(ws))) AS t(g)
),
runs AS (
  SELECT doc_id, max(run) AS max_token_run FROM (
    SELECT doc_id, tok, count(*) AS run
    FROM (SELECT doc_id, pos, tok,
                 pos - row_number() OVER (PARTITION BY doc_id, tok ORDER BY pos) AS isl
          FROM toks) i
    GROUP BY doc_id, tok, isl
  ) r GROUP BY doc_id
)
SELECT n.doc_id, n.n_tokens,
       round(coalesce(bg.top_bigram_frac, 0.0), 6) AS top_bigram_frac,
       round(coalesce(tg.dup_trigram_frac, 0.0), 6) AS dup_trigram_frac,
       CAST(coalesce(runs.max_token_run, 0) AS BIGINT) AS max_token_run,
       (coalesce(bg.top_bigram_frac, 0.0) <= {TOP_BIGRAM_MAX}
        AND coalesce(runs.max_token_run, 0) <= {MAX_RUN_MAX}) AS pass_repetition
FROM ntok n
LEFT JOIN bg ON n.doc_id = bg.doc_id
LEFT JOIN tg ON n.doc_id = tg.doc_id
LEFT JOIN runs ON n.doc_id = runs.doc_id
"""


# -- PII redaction -----------------------------------------------------------

# patterns restricted to syntax with identical semantics in Java regex
# (Spark) and RE2 (DuckDB): no lookaround, no backrefs
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"


def pii_redact(documents: DataFrame) -> DataFrame:
    """PII detection + redaction: emails, phone numbers, and IPv4 addresses
    replaced with typed placeholders; per-doc match counts for audit.

    Replacement is applied email -> phone -> ip (emails can contain digit
    runs, so they are redacted before the phone/ip patterns can bite into
    them), and each count is measured on the SAME intermediate its
    replacement pass sees — n_phones on the email-redacted text, n_ips on
    the email+phone-redacted text — so the audit counts tie out exactly
    with what redaction replaced (a digit run inside an email address is
    never double-counted as a phone).

    Pure codegen projection: runs at scan speed at any corpus size.
    Output: (doc_id, n_emails, n_phones, n_ips, clean_text).
    """
    t = F.col("text")
    red1 = F.regexp_replace(t, EMAIL_RE, "<EMAIL>")
    red2 = F.regexp_replace(red1, PHONE_RE, "<PHONE>")
    red3 = F.regexp_replace(red2, IPV4_RE, "<IP>")
    return documents.select(
        "doc_id",
        F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), F.lit(0))).cast("bigint").alias("n_emails"),
        F.size(F.regexp_extract_all(red1, F.lit(PHONE_RE), F.lit(0)))
        .cast("bigint")
        .alias("n_phones"),
        F.size(F.regexp_extract_all(red2, F.lit(IPV4_RE), F.lit(0))).cast("bigint").alias("n_ips"),
        red3.alias("clean_text"),
    )


PII_REDACT_SQL = f"""
WITH staged AS (
  SELECT doc_id, text,
         regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g') AS red1,
         regexp_replace(
           regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g'),
           '{PHONE_RE}', '<PHONE>', 'g') AS red2
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(red1, '{PHONE_RE}')) AS BIGINT) AS n_phones,
       CAST(len(regexp_extract_all(red2, '{IPV4_RE}')) AS BIGINT) AS n_ips,
       regexp_replace(red2, '{IPV4_RE}', '<IP>', 'g') AS clean_text
FROM staged
"""


# -- corpus-wide exact line dedup -------------------------------------------

# encoded first-occurrence key: doc_id * _POS_LIMIT + pos. Mergeable min()
# instead of a window over the line value (see module docstring). Documents
# with >= 1e6 lines would alias encoded keys, so the encoding raises on them
# (raise_error below) rather than silently corrupting first-occurrence order.
_POS_LIMIT = 1_000_000


def line_dedup(documents: DataFrame) -> DataFrame:
    """Corpus-wide exact line deduplication (the CCNet step): every line
    keeps only its FIRST occurrence across the whole corpus (first = lowest
    (doc_id, line position)); later occurrences are dropped and each doc is
    reassembled from its surviving lines.

    Output: (doc_id, n_lines, n_kept, clean_text) — one row per input doc;
    docs whose every line was seen earlier come back with n_kept = 0 and
    empty text (downstream length filters drop them).

    First-occurrence selection is ``min(doc_id * 1e6 + pos)`` per line — a
    combinable aggregate, so hot boilerplate lines partial-aggregate
    map-side instead of skewing one reducer.
    """
    ekey = F.when(
        F.col("pos") < _POS_LIMIT, F.col("doc_id") * _POS_LIMIT + F.col("pos")
    ).otherwise(
        F.raise_error(
            F.format_string(
                "line_dedup: doc_id %s has >= %s lines; encoded key would alias",
                F.col("doc_id").cast("string"),
                F.lit(str(_POS_LIMIT)),
            )
        )
    )
    lines = documents.select(
        "doc_id", F.posexplode(F.split("text", "\n")).alias("pos", "line")
    ).withColumn("ekey", ekey)
    winners = lines.groupBy("line").agg(F.min("ekey").alias("ekey"))
    kept = lines.join(winners, ["line", "ekey"])
    rebuilt = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))), lambda s: s["line"]
            ),
            "\n",
        ).alias("clean_text"),
    )
    return (
        documents.select("doc_id", F.size(F.split("text", "\n")).cast("bigint").alias("n_lines"))
        .join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            "n_lines",
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("bigint").alias("n_kept"),
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
        )
    )


LINE_DEDUP_SQL = f"""
WITH lines AS (
  SELECT doc_id, g - 1 AS pos, ls[g] AS line,
         doc_id * {_POS_LIMIT} + g - 1 AS ekey
  FROM (SELECT doc_id, string_split(text, chr(10)) AS ls FROM documents) t,
       unnest(generate_series(1, len(ls))) AS u(g)
),
winners AS (SELECT line, min(ekey) AS ekey FROM lines GROUP BY line),
kept AS (SELECT l.* FROM lines l JOIN winners w ON l.line = w.line AND l.ekey = w.ekey),
rebuilt AS (
  SELECT doc_id, count(*) AS n_kept,
         string_agg(line, chr(10) ORDER BY pos) AS clean_text
  FROM kept GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(len(string_split(d.text, chr(10))) AS BIGINT) AS n_lines,
       CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_kept,
       coalesce(r.clean_text, '') AS clean_text
FROM documents d LEFT JOIN rebuilt r ON d.doc_id = r.doc_id
"""


def compression_ratio(documents: DataFrame, level: int = 6) -> DataFrame:
    """Per-document zlib compression ratio — the redundancy quality signal
    (boilerplate/template/spam text compresses far better than prose; the
    Gopher-family pipelines threshold on exactly this).

    Arrow-batched ``mapInPandas`` over stdlib zlib (no Python-side shuffle;
    one narrow pass). Ratio = deflated_bytes / utf8_bytes, rounded —
    LOW means highly repetitive. Empty docs get ratio NULL rather than a
    division blow-up.

    Output: (doc_id, n_bytes, ratio).
    """
    def score(batches):
        import zlib

        import pandas as pd

        for pdf in batches:
            ids, sizes, ratios = [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                raw = (text or "").encode("utf-8")
                ids.append(doc_id)
                sizes.append(len(raw))
                ratios.append(
                    round(len(zlib.compress(raw, level)) / len(raw), 6) if raw else None
                )
            yield pd.DataFrame({"doc_id": ids, "n_bytes": sizes, "ratio": ratios})

    return documents.select("doc_id", "text").mapInPandas(
        score, schema="doc_id bigint, n_bytes bigint, ratio double"
    )
