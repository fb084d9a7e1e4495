"""Hybrid retrieval: reciprocal-rank fusion (RRF) of a lexical (BM25) and a
semantic (embedding cosine) ranked list — the retrieval composition an
LLM-data pipeline actually serves (targeted corpus slicing, RAG indexing,
decontamination probes), and the standard way to combine incomparable
scoring scales without tuning (Cormack/Clarke/Buettcher, SIGIR'09:
``score(d) = sum over lists of 1 / (k + rank_list(d))``).

The reference has no retrieval surface (SURVEY §2.5); this extends the
§2.7 north-star retrieval pair (:mod:`.retrieval` BM25, :mod:`.similarity`
cosine top-k) into the fused operator.

Scale posture (100 TB corpus):

- The two branch operators carry the scale story (query-term-filtered
  postings for BM25; broadcast-query brute force or IVF/LSH candidate
  pruning for the embedding side — both audited on their own faces). The
  fusion itself only ever touches Q x depth rows per list (user-sized),
  grouped on (q_id, doc_id) — a KB-scale shuffle regardless of corpus size.
- RRF needs RANKS, not scores, so the branches' per-query top-``depth``
  windows (query-count parallelism) are the only ordering work; no global
  sort exists anywhere in the plan.

Exactness: ranks are integers, each fused score is a sum of AT MOST ONE
term per list (two lists here) — IEEE addition of two doubles is
commutative, so the fused score is bit-identical across engines regardless
of aggregation order; ties break on doc_id after 6-dp rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: RRF smoothing constant (the SIGIR'09 default; large enough that a
#: rank-1-vs-2 gap cannot dominate an appears-in-both-lists signal)
RRF_K = 60


def rrf_fuse(
    lists: list[DataFrame],
    k_const: int = RRF_K,
    k: int = 10,
) -> DataFrame:
    """Fuse ranked lists by reciprocal rank.

    Each input frame must carry ``(q_id, doc_id, rk)`` with ``rk`` starting
    at 1 per query (extra columns are dropped). Output:
    ``(q_id, doc_id, rrf, rk)`` — top-``k`` per query by fused score,
    6-dp-rounded with doc_id tiebreak so the membership is reproducible
    across engines.
    """
    if not lists:
        raise ValueError("rrf_fuse needs at least one ranked list")
    tagged = lists[0].select("q_id", "doc_id", "rk")
    for other in lists[1:]:
        tagged = tagged.unionByName(other.select("q_id", "doc_id", "rk"))
    fused = tagged.groupBy("q_id", "doc_id").agg(
        F.round(F.sum(F.lit(1.0) / (F.lit(k_const) + F.col("rk"))), 6).alias("rrf")
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("rrf"), F.asc("doc_id"))
    return (
        fused.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= k)
        .select("q_id", "doc_id", "rrf", "rk")
        .orderBy("q_id", "rk")
    )


def hybrid_search(
    documents: DataFrame,
    embeddings: DataFrame,
    n_queries: int = 3,
    depth: int = 20,
    k: int = 10,
    k_const: int = RRF_K,
) -> DataFrame:
    """Hybrid search over the shared corpus id space (``doc_id`` and
    ``vec_id`` both index the same 0..N-1 synthetic corpus): for queries
    0..n_queries-1, fuse

    - the lexical list — :func:`..retrieval.bm25_topk` over the
      driver-contract term queries (q_id 0..2), depth ``depth``;
    - the semantic list — exact cosine top-``depth`` where query q's vector
      is ``vec_id == q`` and candidates are ``vec_id >= n_queries`` (the
      :func:`..similarity.knn_brute` convention).

    Returns the RRF top-``k`` per query: ``(q_id, doc_id, rrf, rk)``.
    """
    from baum_welch_spark.operators.retrieval import DEFAULT_QUERIES, bm25_topk
    from baum_welch_spark.operators.similarity import knn_brute

    if n_queries > len(DEFAULT_QUERIES):
        raise ValueError(
            f"n_queries={n_queries} exceeds the {len(DEFAULT_QUERIES)}-entry "
            "driver-contract term-query set"
        )
    lexical = bm25_topk(documents, queries=DEFAULT_QUERIES[:n_queries], k=depth)
    semantic = knn_brute(embeddings, n_queries=n_queries, k=depth).select(
        "q_id", F.col("c_id").alias("doc_id"), "rk"
    )
    return rrf_fuse([lexical, semantic], k_const=k_const, k=k)


def semantic_topk(
    embeddings: DataFrame, q_vec_id: int, depth: int = 20, q_id: int = 0
) -> DataFrame:
    """Cosine top-``depth`` for ONE query vector given by corpus id (the
    CLI's hybrid mode: the caller names the pre-embedded query row; this
    engine ships no embedding model). Returns ``(q_id, doc_id, rk)`` in
    :func:`rrf_fuse`'s input shape. Query row broadcast, corpus scan
    shuffle-free — the ``knn_brute`` posture for a single query.
    """
    from baum_welch_spark.functions.columns import as_double_array as _as_double
    from baum_welch_spark.functions.columns import dot as _dot
    from baum_welch_spark.functions.columns import l2_norm as _norm

    q = embeddings.filter(F.col("vec_id") == q_vec_id).select(
        _as_double(F.col("embedding")).alias("qv")
    )
    # a missing query row would otherwise silently yield an empty semantic
    # list and the caller's "hybrid" result would be pure-lexical; the
    # lookup is a pushed-filter single-row probe, so failing fast is cheap
    if q.limit(1).count() == 0:
        raise ValueError(f"no embedding row with vec_id={q_vec_id}")
    c = embeddings.filter(F.col("vec_id") != q_vec_id).select(
        F.col("vec_id").alias("doc_id"), _as_double(F.col("embedding")).alias("cv")
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        "doc_id",
        F.round(
            _dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv"))),
            6,
        ).alias("cos"),
    )
    w = Window.partitionBy(F.lit(q_id)).orderBy(F.desc("cos"), F.asc("doc_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= depth)
        .select(F.lit(q_id).cast("int").alias("q_id"), "doc_id", "rk")
    )


def hybrid_search_sql(
    n_queries: int = 3,
    depth: int = 20,
    k: int = 10,
    k_const: int = RRF_K,
) -> str:
    """DuckDB-exact oracle for :func:`hybrid_search`: the SHARED BM25
    posting/scoring fragments (:func:`..retrieval.bm25_postings_ctes` /
    :data:`..retrieval.BM25_SCORE_SUM_SQL`) at this face's ``depth`` and
    query subset, plus the shared cosine fragments
    (:func:`..similarity.knn_split_ctes` /
    :data:`..similarity.COSINE_QC_SQL_EXPR`), fused with the same two-term
    reciprocal-rank sum — one copy of each branch's committed math. Both
    branch chains keep their committed 6-dp rank determinism, so the rank
    integers — and therefore the fused sums — are bit-identical.
    """
    from baum_welch_spark.operators.retrieval import (
        BM25_SCORE_SUM_SQL,
        DEFAULT_QUERIES,
        bm25_postings_ctes,
    )
    from baum_welch_spark.operators.similarity import (
        COSINE_QC_SQL_EXPR,
        knn_split_ctes,
    )

    rows = []
    for qid, qtext in DEFAULT_QUERIES[:n_queries]:
        for t in dict.fromkeys(qtext.lower().split()):
            rows.append(f"({qid}, '{t}')")
    values = ", ".join(rows)
    return f"""
WITH {bm25_postings_ctes(values)},
bm25_scored AS (
  SELECT t.q_id, f.doc_id,
         round({BM25_SCORE_SUM_SQL}, 6) AS score
  FROM tf f
  JOIN terms t ON f.token = t.token
  JOIN df_t d ON f.token = d.token
  JOIN doc_len l ON f.doc_id = l.doc_id
  CROSS JOIN consts c
  GROUP BY t.q_id, f.doc_id
),
lexical AS (
  SELECT q_id, doc_id,
         row_number() OVER (PARTITION BY q_id ORDER BY score DESC, doc_id ASC) AS rk
  FROM bm25_scored
  QUALIFY rk <= {depth}
),
{knn_split_ctes(n_queries)},
cos_scored AS (
  SELECT q_id, c_id,
         {COSINE_QC_SQL_EXPR}
  FROM c, q
),
semantic AS (
  SELECT q_id, c_id AS doc_id,
         row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id ASC) AS rk
  FROM cos_scored
  QUALIFY rk <= {depth}
),
fused AS (
  SELECT q_id, doc_id,
         round(sum(CAST(1 AS DOUBLE) / ({k_const} + rk)), 6) AS rrf
  FROM (
    SELECT q_id, doc_id, rk FROM lexical
    UNION ALL
    SELECT q_id, doc_id, rk FROM semantic
  )
  GROUP BY q_id, doc_id
)
SELECT q_id, doc_id, rrf,
       CAST(row_number() OVER (PARTITION BY q_id ORDER BY rrf DESC, doc_id ASC) AS BIGINT) AS rk
FROM fused
QUALIFY rk <= {k}
ORDER BY q_id, rk
"""


#: the face's oracle (driver-contract parameters)
HYBRID_SEARCH_SQL = hybrid_search_sql()
