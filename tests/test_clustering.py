"""K-means + IVF(k-means) tests: Lloyd monotonicity, NumPy single-iteration
oracle, partitioning invariance, and ANN recall vs brute force."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from baum_welch_spark.operators.clustering import (
    _init_centroids,
    assign_clusters,
    kmeans_fit,
    knn_ivf_kmeans,
)
from baum_welch_spark.operators.similarity import knn_brute
from baum_welch_spark.sources.io import load_table

from conftest import SF0001


@pytest.fixture(scope="module")
def embeddings(spark):
    return load_table(spark, SF0001, "embeddings").cache()


def _matrix(embeddings):
    pdf = embeddings.select("vec_id", "embedding").toPandas().sort_values("vec_id")
    ids = pdf["vec_id"].to_numpy()
    M = np.vstack([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
    return ids, M


def test_kmeans_inertia_monotone(spark, embeddings):
    _, trace = kmeans_fit(embeddings, k=8, max_iter=8, seed=7)
    assert len(trace) >= 2
    for a, b in zip(trace, trace[1:]):
        assert b <= a + 1e-6, trace


def test_kmeans_one_iteration_matches_numpy(spark, embeddings):
    """One distributed Lloyd step == the NumPy step from the same seed."""
    ids, X = _matrix(embeddings)
    C0 = _init_centroids(embeddings, k=8, seed=7)
    got, trace = kmeans_fit(embeddings, k=8, max_iter=1, seed=7)
    d2 = (X * X).sum(1)[:, None] - 2 * X @ C0.T + (C0 * C0).sum(1)[None, :]
    a = np.argmin(d2, axis=1)
    expect = C0.copy()
    for c in range(8):
        if (a == c).any():
            expect[c] = X[a == c].mean(axis=0)
    assert np.allclose(got, expect, atol=1e-9)
    assert abs(trace[0] - float(d2[np.arange(len(a)), a].sum())) < 1e-6 * max(1.0, trace[0])


def test_kmeans_partitioning_invariant(spark, embeddings):
    c1, _ = kmeans_fit(embeddings.repartition(1), k=6, max_iter=3, seed=11)
    c32, _ = kmeans_fit(embeddings.repartition(32), k=6, max_iter=3, seed=11)
    assert np.allclose(c1, c32, atol=1e-9)


def test_assign_clusters_covers_all_rows(spark, embeddings):
    C, _ = kmeans_fit(embeddings, k=8, max_iter=2, seed=7)
    assigned = assign_clusters(embeddings, C)
    n = embeddings.count()
    assert assigned.count() == n
    assert assigned.select("vec_id").distinct().count() == n
    assert assigned.agg(F.min("cluster"), F.max("cluster")).first()[1] < 8


def test_knn_ivf_kmeans_recall_vs_brute(spark, embeddings):
    brute = {(r.q_id, r.c_id) for r in knn_brute(embeddings, n_queries=5, k=5).collect()}
    ivf = {
        (r.q_id, r.c_id)
        for r in knn_ivf_kmeans(
            embeddings, n_queries=5, k=5, n_clusters=16, n_probe=4
        ).collect()
    }
    recall = len(brute & ivf) / len(brute)
    assert recall >= 0.5, f"IVF(kmeans) recall {recall}"
    # scored candidates must carry exact cosines: every overlapping pair agrees
    bcos = {(r.q_id, r.c_id): r.cos for r in knn_brute(embeddings, n_queries=5, k=5).collect()}
    for r in knn_ivf_kmeans(embeddings, n_queries=5, k=5, n_clusters=16, n_probe=4).collect():
        if (r.q_id, r.c_id) in bcos:
            assert abs(r.cos - bcos[(r.q_id, r.c_id)]) < 1e-9


def test_kmeans_parity_matches_independent_numpy_replica(spark, embeddings):
    """The DuckDB-exact parity twin (kmeans_parity_sql) against a THIRD
    implementation: a numpy replica of the same spec — portable-hash init,
    full-expansion squared distances, cluster-asc tie-break, per-iteration
    centroid rounding to 9. Engine-vs-engine equality is the driver's
    check; this pins the SQL against independent arithmetic."""
    import hashlib

    from baum_welch_spark.operators.clustering import kmeans_parity

    k, iters, seed = 4, 3, 11
    ids, M = _matrix(embeddings)

    def phash(i):
        return int(hashlib.md5(f"{i}:{seed}".encode()).hexdigest()[:15], 16)

    order = sorted(range(len(ids)), key=lambda j: (phash(ids[j]), ids[j]))
    C = M[order[:k]].copy()
    for t in range(iters):
        d2 = ((M[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        a = np.argmin(d2, axis=1)  # numpy argmin ties -> lowest index = cluster asc
        if t < iters - 1:
            for c in range(k):
                if (a == c).any():
                    C[c] = np.round(M[a == c].mean(axis=0), 9)
    got = {r.cluster: (r.n, r.avg_d2) for r in kmeans_parity(spark, embeddings).collect()}
    expect = {
        c: ((a == c).sum(), round(float(d2[a == c, c].mean()), 6))
        for c in range(k)
        if (a == c).any()
    }
    assert {c: n for c, (n, _) in got.items()} == {c: n for c, (n, _) in expect.items()}
    for c in expect:
        # numpy's vectorized sums reassociate, so compare the readout at
        # the spec's rounding minus one guard digit
        assert abs(got[c][1] - expect[c][1]) < 1e-5, (c, got[c], expect[c])
