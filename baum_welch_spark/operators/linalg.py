"""Distributed linear algebra over the ``embeddings`` table: exact
covariance (the Gram-matrix reduction) and PCA projection — the
dimensionality-reduction / whitening step an embedding-heavy training
pipeline runs before clustering, ANN indexing, or near-dup thresholding.

Scale posture (100 TB of vectors, d ~ 10^2..10^3):

- ``emb_covariance`` — each Arrow batch folds into ONE d x d float64 GEMM
  partial (X^T X, column sums, count) inside ``mapInPandas``; the shuffle
  moves O(partitions x d^2) flattened triangle rows, never vector rows.
  This is the same in-UDF-combine shape as the E-step (`hmm/fit.py`) and
  k-means (`clustering.py`): corpus size never enters shuffle volume.
- ``emb_pca`` — eigendecomposition happens on the driver over the d x d
  covariance (model-sized, like the HMM model collect); the projection back
  over the corpus is a shuffle-free Catalyst fold against literal
  component vectors. No vector ever reaches the driver.

``emb_covariance`` is oracle-checked exactly (rounded); ``emb_pca`` is
rows-only in the driver contract (eigenvectors are not SQL-expressible) but
pinned by variance/orthogonality property tests.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: sentinel index: rows with i == -1 carry column sums (j is the column),
#: the (-1, -1) row carries the vector count
_SUM_ROW = -1


def _cov_partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    d = None
    sxx = None
    sx = None
    n = 0
    for pdf in batches:
        if not len(pdf):
            continue
        X = np.vstack([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
        if sxx is None:
            d = X.shape[1]
            sxx = np.zeros((d, d))
            sx = np.zeros(d)
        sxx += X.T @ X
        sx += X.sum(axis=0)
        n += len(X)
    if d is None:
        return
    iu, ju = np.triu_indices(d)
    i = np.concatenate([iu, np.full(d, _SUM_ROW), [_SUM_ROW]]).astype(np.int32)
    j = np.concatenate([ju, np.arange(d), [_SUM_ROW]]).astype(np.int32)
    v = np.concatenate([sxx[iu, ju], sx, [float(n)]])
    yield pd.DataFrame({"i": i, "j": j, "v": v})


def emb_covariance(embeddings: DataFrame) -> DataFrame:
    """Exact population covariance of the embedding columns, upper triangle.

    Output: (i, j, cov) for 0 <= i <= j < d, cov rounded to 6 dp
    (cross-engine float-summation-order tolerance, like every rounded
    aggregate in the contract).
    """
    partials = embeddings.select("embedding").mapInPandas(
        _cov_partials, schema="i int, j int, v double"
    )
    sums = partials.groupBy("i", "j").agg(F.sum("v").alias("v"))
    n_row = sums.where((F.col("i") == _SUM_ROW) & (F.col("j") == _SUM_ROW)).select(
        F.col("v").alias("n")
    )
    means = (
        sums.where((F.col("i") == _SUM_ROW) & (F.col("j") != _SUM_ROW))
        .join(F.broadcast(n_row), how="cross")
        .select(F.col("j").alias("m_idx"), (F.col("v") / F.col("n")).alias("m"))
    )
    tri = sums.where(F.col("i") != _SUM_ROW)
    ma = means.select(F.col("m_idx").alias("i"), F.col("m").alias("m_i"))
    mb = means.select(F.col("m_idx").alias("j"), F.col("m").alias("m_j"))
    return (
        tri.join(F.broadcast(n_row), how="cross")
        .join(F.broadcast(ma), "i")
        .join(F.broadcast(mb), "j")
        .select(
            F.col("i").cast("bigint").alias("i"),
            F.col("j").cast("bigint").alias("j"),
            F.round(F.col("v") / F.col("n") - F.col("m_i") * F.col("m_j"), 6).alias("cov"),
        )
        .orderBy("i", "j")
    )


EMB_COVARIANCE_SQL = """
WITH x AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
         unnest(embedding)::DOUBLE AS v
  FROM embeddings
),
means AS (SELECT i, avg(v) AS m FROM x GROUP BY i),
pairs AS (
  SELECT a.i AS i, b.i AS j, sum(a.v * b.v) AS sxx, count(*) AS n
  FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.i <= b.i
  GROUP BY a.i, b.i
)
SELECT p.i::BIGINT AS i, p.j::BIGINT AS j,
       round(p.sxx / p.n - ma.m * mb.m, 6) AS cov
FROM pairs p
JOIN means ma ON p.i = ma.i
JOIN means mb ON p.j = mb.i
ORDER BY i, j
"""


def pca_components(embeddings: DataFrame, k: int = 2) -> tuple[np.ndarray, np.ndarray]:
    """Top-``k`` principal components from the distributed covariance.

    The covariance collect is d(d+1)/2 rows — model-sized, same shape as
    the HMM model collect in `hmm/fit.py` — and ``eigh`` runs on the d x d
    matrix on the driver. Components are sign-fixed (largest-magnitude
    entry positive, first-index tiebreak) so the output is deterministic.

    Returns (mean vector, components matrix k x d).
    """
    rows = emb_covariance(embeddings).collect()
    if not rows:
        raise ValueError("pca_components: empty embeddings table")
    d = max(r["j"] for r in rows) + 1
    C = np.zeros((d, d))
    for r in rows:
        C[r["i"], r["j"]] = C[r["j"], r["i"]] = r["cov"]
    vals, vecs = np.linalg.eigh(C)
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T  # k x d
    for c in comps:
        lead = np.argmax(np.abs(np.round(c, 9)))
        if c[lead] < 0:
            c *= -1.0
    # mean vector via one more tiny aggregate (d columns)
    mean_row = (
        embeddings.select(
            F.posexplode(F.col("embedding").cast("array<double>")).alias("i", "v")
        )
        .groupBy("i")
        .agg(F.avg("v").alias("m"))
        .orderBy("i")
        .collect()
    )
    mean = np.array([r["m"] for r in mean_row])
    return mean, comps


def emb_pca(embeddings: DataFrame, k: int = 2) -> DataFrame:
    """Project every embedding onto the top-``k`` principal components.

    The projection is a pure Catalyst fold against literal component
    vectors — shuffle-free over the corpus. Output: (vec_id, pc0..pc{k-1})
    rounded to 6 dp.
    """
    from baum_welch_spark.functions.columns import as_double_array, dot

    if embeddings.isEmpty():  # empty corpus -> empty projection
        return embeddings.sparkSession.createDataFrame(
            [], "vec_id long, " + ", ".join(f"pc{ki} double" for ki in range(k))
        )
    mean, comps = pca_components(embeddings, k)
    emb = as_double_array(F.col("embedding"))
    centered = F.zip_with(
        emb, F.array(*[F.lit(float(m)) for m in mean]), lambda x, m: x - m
    )
    # eigh yields at most d components; k > d clamps to d output columns
    cols = [
        F.round(
            dot(centered, F.array(*[F.lit(float(c)) for c in comps[ki]])), 6
        ).alias(f"pc{ki}")
        for ki in range(len(comps))
    ]
    return embeddings.select("vec_id", *cols).orderBy("vec_id")
