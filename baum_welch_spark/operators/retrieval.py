"""Full-text retrieval over ``documents``: BM25 scoring with per-query
top-k — the lexical-search counterpart of :mod:`.similarity`'s embedding
ANN, and the retrieval primitive an LLM-data pipeline uses for targeted
corpus slicing (find all docs about X) and RAG-style indexing.

The reference has no text surface (SURVEY §2.5); this is a §2.7 north-star
extension, pure Catalyst with DuckDB-portable math so the whole operator is
oracle-checked exactly.

Scale posture (100 TB corpus):

- The query set is user-sized (tens of terms), so the term list broadcasts
  and the corpus-side posting build FILTERS to query terms before its only
  corpus-keyed shuffle — per-(doc, term) tf aggregation over matching tokens
  only. A 100 TB corpus with a 10-term query shuffles just the matching
  postings, not the corpus.
- Document lengths and corpus constants (N, avgdl) are combinable aggregates
  (1 row out), broadcast back.
- The final top-k ranks within query-id partitions — query-count
  parallelism, never a global single-partition window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: BM25 shape parameters (Robertson/Sparck-Jones defaults)
BM25_K1 = 1.2
BM25_B = 0.75

#: driver-contract query set: (q_id, space-separated terms). Terms mirror the
#: synthetic corpus vocabulary so every query has matches at every sf.
DEFAULT_QUERIES: list[tuple[int, str]] = [
    (0, "spark join merge"),
    (1, "window agg group"),
    (2, "vector scan filter"),
]


def _words(col: str = "text"):
    from baum_welch_spark.functions.columns import words

    return words(col)


def bm25_topk(
    documents: DataFrame,
    queries: list[tuple[int, str]] | None = None,
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Top-``k`` documents per query under BM25.

    score(q, d) = sum over t in q of
        ln(1 + (N - df_t + 0.5) / (df_t + 0.5))
        * tf_td * (k1 + 1) / (tf_td + k1 * (1 - b + b * len_d / avgdl))

    (the Lucene ``+1``-inside-the-log IDF variant, always non-negative).

    Ranking uses the ROUNDED score (6 dp) with doc_id as tiebreaker so the
    order — and therefore the top-k membership — is reproducible across
    engines regardless of float summation order.

    Output: (q_id, doc_id, score, rk), rk in 1..k per query.
    """
    # lowercase query text: the corpus tokenizer (words()) lowercases every
    # token, so un-normalized queries like "Spark" would silently match nothing
    qrows = [(qid, qtext.lower()) for qid, qtext in (queries or DEFAULT_QUERIES)]
    spark = documents.sparkSession
    terms = spark.createDataFrame(
        [(qid, t) for qid, qtext in qrows for t in dict.fromkeys(qtext.split())],
        "q_id int, token string",
    )
    term_set = sorted({t for _, qtext in qrows for t in qtext.split()})

    # ONE tokenize pass (r14 optimization round, guide §2.3/§3.3): the old
    # explode-based `toks` subtree fed doc_len→consts, doc_len→scored and
    # tf→df_t, tf→scored — Catalyst inlined it per consumer, so the corpus
    # was scanned and tokenized 4x per invocation. `split` never returns an
    # empty array (split('', ' ') is ['']), so size(ws) equals the exploded
    # token count EXACTLY and per-doc lengths stay integer-exact (avg over
    # longs sums exactly — order-independent); filtering the array to query
    # terms before the only explode keeps the corpus-side shuffle at
    # matching postings only, same rows as the old isin() filter. The
    # doc-sized projection (id + int + matched-terms array) is materialized
    # once and shared by all consumers.
    base = (
        documents.select("doc_id", _words().alias("ws"))
        .select(
            "doc_id",
            F.size("ws").alias("len_d"),
            F.filter("ws", lambda w: w.isin(term_set)).alias("qtoks"),
        )
        .localCheckpoint(eager=False)
    )
    doc_len = base.select("doc_id", "len_d")
    # corpus constants: one combinable pass, 1 row, broadcast back
    consts = base.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("len_d").alias("avgdl")
    )
    # postings restricted to query terms BEFORE the (doc, term) shuffle —
    # the corpus never shuffles for terms nobody asked about
    tf = (
        base.select("doc_id", F.explode("qtoks").alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)
    )
    df_t = tf.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))

    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tf_norm = (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + k1 * (1 - b + b * F.col("len_d") / F.col("avgdl"))
    )
    scored = (
        tf.join(F.broadcast(terms), "token")
        .join(F.broadcast(df_t), "token")
        .join(doc_len, "doc_id")
        .join(F.broadcast(consts), how="cross")
        .groupBy("q_id", "doc_id")
        .agg(F.round(F.sum(idf * tf_norm), 6).alias("score"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= k)
        .select("q_id", "doc_id", "score", "rk")
        .orderBy("q_id", "rk")
    )


def _sql_query_values() -> str:
    rows = []
    for qid, qtext in DEFAULT_QUERIES:
        for t in dict.fromkeys(qtext.split()):
            rows.append(f"({qid}, '{t}')")
    return ", ".join(rows)


def bm25_postings_ctes(values: str) -> str:
    """``terms`` → ``df_t``: the corpus-side posting chain as a WITH-body
    fragment (no leading ``WITH``) for the given query VALUES — one copy of
    the committed tokenize/tf/df math, shared by :data:`BM25_TOPK_SQL` and
    ``fusion.hybrid_search_sql``."""
    return f"""terms(q_id, token) AS (VALUES {values}),
toks AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token FROM documents
),
doc_len AS (SELECT doc_id, count(*) AS len_d FROM toks GROUP BY doc_id),
consts AS (SELECT count(*) AS n_docs, avg(len_d) AS avgdl FROM doc_len),
tf AS (
  SELECT doc_id, token, count(*) AS tf FROM toks
  WHERE token IN (SELECT DISTINCT token FROM terms)
  GROUP BY doc_id, token
),
df_t AS (SELECT token, count(DISTINCT doc_id) AS df FROM tf GROUP BY token)"""


#: the BM25 scoring sum over the posting chain's aliases (f/t/d/l/c) — the
#: single copy of the committed idf x tf-norm math; wrap in round(..., 6)
BM25_SCORE_SUM_SQL = f"""sum(
           ln(1.0 + (c.n_docs - d.df + 0.5) / (d.df + 0.5))
           * f.tf * ({BM25_K1} + 1)
           / (f.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * l.len_d / c.avgdl))
         )"""


BM25_TOPK_SQL = f"""
WITH {bm25_postings_ctes(_sql_query_values())},
scored AS (
  SELECT t.q_id, f.doc_id,
         round({BM25_SCORE_SUM_SQL}, 6) AS score
  FROM tf f
  JOIN terms t ON f.token = t.token
  JOIN df_t d ON f.token = d.token
  JOIN doc_len l ON f.doc_id = l.doc_id
  CROSS JOIN consts c
  GROUP BY t.q_id, f.doc_id
)
SELECT q_id, doc_id, score,
       CAST(row_number() OVER (PARTITION BY q_id ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rk
FROM scored
QUALIFY rk <= 10
ORDER BY q_id, rk
"""
