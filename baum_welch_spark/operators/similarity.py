"""Similarity search over the ``embeddings`` table (north-star §2.7).

  * knn_brute    — exact cosine top-k, pure Catalyst (zip_with + aggregate
                   fold in double precision, JVM-side, no UDF), query side
                   broadcast. The correctness baseline.
  * knn_ivf      — IVF-style approximate top-k: coarse centroids via
                   deterministic hash-partition ("random projection sign
                   buckets"), probe the query's bucket only. The scale path:
                   the candidate join touches 1/2^bits of the corpus.
  * emb_norms    — per-vector L2 norm / dim sanity projection.

Scale notes: brute-force is O(Q x N) — fine for Q small whatever N is, as
the corpus side never shuffles (the query side broadcasts). For N-to-N
all-pairs at 100 TB use the IVF bucketing (equi-join on bucket id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from baum_welch_spark.functions.columns import as_double_array as _as_double
from baum_welch_spark.functions.columns import dot as _dot
from baum_welch_spark.functions.columns import l2_norm as _norm


def emb_norms(embeddings: DataFrame) -> DataFrame:
    v = _as_double(F.col("embedding"))
    return embeddings.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(_norm(v), 6).alias("l2_norm"),
    )


EMB_NORMS_SQL = """
SELECT vec_id,
       len(embedding) AS dim,
       round(sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))), 6) AS l2_norm
FROM embeddings
"""


def knn_brute(embeddings: DataFrame, n_queries: int = 5, k: int = 5) -> DataFrame:
    """Exact cosine top-k: queries = vec_id < n_queries, candidates = the rest.

    The small query side is broadcast, so the corpus scan is shuffle-free;
    ranking is a per-query window (tiny: Q x N rows reduced to Q x k).
    Deterministic tiebreak on (cos desc, vec_id asc) after rounding, so ulp
    noise cannot reorder the oracle comparison.
    """
    q = embeddings.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"), _as_double(F.col("embedding")).alias("qv")
    )
    c = embeddings.filter(F.col("vec_id") >= n_queries).select(
        F.col("vec_id").alias("c_id"), _as_double(F.col("embedding")).alias("cv")
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        "q_id",
        "c_id",
        F.round(_dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv"))), 6).alias("cos"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("c_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("q_id", "c_id", "cos", "rk")
    )


KNN_BRUTE_SQL = """
WITH q AS (
  SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 5
),
c AS (
  SELECT vec_id AS c_id, embedding::DOUBLE[] AS cv FROM embeddings WHERE vec_id >= 5
),
scored AS (
  SELECT q_id, c_id,
         round(list_sum(list_transform(list_zip(qv, cv), p -> p[1] * p[2]))
               / (sqrt(list_sum(list_transform(qv, x -> x * x)))
                  * sqrt(list_sum(list_transform(cv, x -> x * x)))), 6) AS cos
  FROM c, q
),
ranked AS (
  SELECT q_id, c_id, cos,
         row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id ASC) AS rk
  FROM scored
)
SELECT q_id, c_id, cos, rk FROM ranked WHERE rk <= 5
"""


def knn_ivf(embeddings: DataFrame, n_queries: int = 5, k: int = 5, bits: int = 2) -> DataFrame:
    """Approximate top-k: random-projection sign buckets (an IVF/LSH hybrid).

    bucket(v) = sign bits of <v, r_b> for ``bits`` deterministic pseudo-random
    directions r_b (elementwise +/-1 pattern derived from (b * index) parity —
    no driver randomness, so the operator is reproducible and oracle-friendly).
    Queries probe only their own bucket: the join is an equi-join on bucket,
    touching ~1/2^bits of the corpus — the 100 TB shape.
    """
    v = _as_double(F.col("embedding"))

    def direction_lambda(b: int):
        # deterministic +/-1 direction: sign = parity of (b+1)*(i+1) mod 3;
        # b is closed over (an extra lambda param would be read as the
        # higher-order function's index argument)
        def f(x, i):
            return x * F.when(((i + 1) * (b + 1)) % 3 < 2, 1.0).otherwise(-1.0)

        return f

    def bucket(col):
        acc = F.lit(0)
        for b in range(bits):
            proj = F.aggregate(
                F.zip_with(col, F.sequence(F.lit(0), F.size(col) - 1), direction_lambda(b)),
                F.lit(0.0),
                lambda a_, x: a_ + x,
            )
            acc = acc + F.when(proj > 0, F.lit(1 << b)).otherwise(F.lit(0))
        return acc

    base = embeddings.select("vec_id", v.alias("v")).withColumn("bucket", bucket(F.col("v")))
    q = base.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv"), "bucket"
    )
    c = base.filter(F.col("vec_id") >= n_queries).select(
        F.col("vec_id").alias("c_id"), F.col("v").alias("cv"), "bucket"
    )
    scored = c.join(F.broadcast(q), "bucket").select(
        "q_id",
        "c_id",
        F.round(_dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv"))), 6).alias("cos"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("c_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("q_id", "c_id", "cos", "rk")
    )
