"""Corpus-internal duplicated n-gram audit: the memorization-risk report an
LLM data pipeline runs next to decontamination (`corpus.decontaminate` checks
overlap with an EVAL set; this finds n-grams repeated WITHIN the training
corpus itself — boilerplate, licenses, templates — the spans a model is most
likely to memorize verbatim).

Scale posture (100 TB corpus):

- The n-gram build is a shuffle-free Catalyst projection (higher-order
  ``transform`` over token positions — no UDF).
- The only corpus-keyed shuffle is the groupBy(ngram) aggregate, which
  Catalyst partially aggregates map-side; boilerplate n-grams (the hot keys)
  are exactly the ones that combine best.
- ``min_df`` filters before the k-sized global top-k (TakeOrdered — never a
  single-partition window), so the driver sees k rows.

The whole operator is DuckDB-expressible: DUP_NGRAMS_SQL builds the same
n-grams with a positional self-join chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: face defaults: 5-grams (the synthetic docs are short; production
#: memorization audits use 13 — the Lee et al. 2021 / GPT-3 convention)
NGRAM_N = 5
MIN_DF = 2
TOP_K = 200


def dup_ngrams(
    documents: DataFrame, n: int = NGRAM_N, min_df: int = MIN_DF, k: int = TOP_K
) -> DataFrame:
    """Top-``k`` word n-grams shared by at least ``min_df`` distinct docs.

    Output: (ngram, total_count, df) ordered by df desc, ngram asc —
    a unique sort key, so the top-k cut is deterministic across engines.
    """
    from baum_welch_spark.functions.columns import words

    # sliding n-grams as a pure Catalyst higher-order fold; Spark's
    # sequence(1, 0) counts DOWN (yielding invalid slice starts), so docs
    # shorter than n take the empty-array branch explicitly
    grams = F.expr(
        f"CASE WHEN size(__w) >= {n} THEN "
        f"transform(sequence(1, size(__w) - {n} + 1), "
        f"i -> array_join(slice(__w, i, {n}), ' ')) "
        f"ELSE array() END"
    )
    return (
        documents.select("doc_id", words("text").alias("__w"))
        .select("doc_id", F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("total_count"),
            F.countDistinct("doc_id").cast("bigint").alias("df"),
        )
        .where(F.col("df") >= min_df)
        .orderBy(F.desc("df"), F.asc("ngram"))
        .limit(k)
    )


def _ngram_concat(n: int) -> str:
    return " || ' ' || ".join(f"t{i}.token" for i in range(n))


def _ngram_joins(n: int) -> str:
    joins = []
    for i in range(1, n):
        joins.append(
            f"JOIN tok t{i} ON t{i}.doc_id = t0.doc_id AND t{i}.pos = t0.pos + {i}"
        )
    return "\n  ".join(joins)


DUP_NGRAMS_SQL = f"""
WITH tok AS (
  SELECT doc_id,
         unnest(string_split(lower(text), ' ')) AS token,
         generate_subscripts(string_split(lower(text), ' '), 1) AS pos
  FROM documents
),
ng AS (
  SELECT t0.doc_id, {_ngram_concat(NGRAM_N)} AS ngram
  FROM tok t0
  {_ngram_joins(NGRAM_N)}
)
SELECT ngram,
       count(*)::BIGINT AS total_count,
       count(DISTINCT doc_id)::BIGINT AS df
FROM ng
GROUP BY ngram
HAVING count(DISTINCT doc_id) >= {MIN_DF}
ORDER BY df DESC, ngram ASC
LIMIT {TOP_K}
"""
