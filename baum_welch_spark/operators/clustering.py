"""K-means over the embeddings table + IVF ANN probing trained centroids.

A second iterative EM-style algorithm expressed in the engine's house style
(the HMM fit, hmm/fit.py, is the first): per-iteration dataflow is

  assignment (E-step)  — mapInPandas GEMM against broadcast centroids
                         (one BLAS call per Arrow batch, no per-row Python)
  partial sums         — emitted FLATTENED as (cluster, pos, val) rows plus
                         (cluster, -1, count) — the stripes-to-rows mapping
                         of SURVEY §1.3, combined in-UDF so shuffle volume
                         is O(partitions × k × d), corpus-size-independent
  M-step               — groupBy(cluster, pos).sum, collect k×(d+1) rows,
                         new centroids on the driver (model-sized only)

``knn_ivf_kmeans`` then uses the trained centroids as a real IVF index:
corpus vectors partition by nearest centroid; each query probes its
``n_probe`` nearest cells only, so the verify join touches ~n_probe/k of
the corpus instead of all of it — the trained-index upgrade over the
hash-bucket :func:`~baum_welch_spark.operators.similarity.knn_ivf`.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

COUNT_POS = -1  # sentinel pos for the per-cluster count row


def _init_centroids(embeddings: DataFrame, k: int, seed: int) -> np.ndarray:
    """Deterministic seeding: the k vectors with the smallest
    murmur3(vec_id, seed) — a uniform pseudo-random sample with no driver
    RNG (Date-free, partitioning-independent)."""
    rows = (
        embeddings.select("vec_id", "embedding", F.hash("vec_id", F.lit(seed)).alias("h"))
        .orderBy("h", "vec_id")
        .limit(k)
        .collect()
    )
    if len(rows) < k:
        # fewer vectors than clusters: the (len(rows), d) centroid matrix
        # would shape-mismatch the k-sized M-step arrays downstream
        raise ValueError(f"k={k} exceeds the number of embedding rows ({len(rows)})")
    return np.vstack([np.asarray(r.embedding, dtype=np.float64) for r in rows])


def kmeans_fit(
    embeddings: DataFrame, k: int = 16, max_iter: int = 10, seed: int = 7, tol: float = 1e-6
) -> tuple[np.ndarray, list[float]]:
    """Lloyd iterations; returns (centroids (k, d), per-iteration inertia).

    Inertia (sum of squared distances to the assigned centroid) is
    non-increasing across iterations — asserted by tests, the k-means
    analogue of the EM log-likelihood guarantee (SURVEY §5.3).
    """
    spark = embeddings.sparkSession
    sc = spark.sparkContext
    src = embeddings.select("vec_id", "embedding")
    centroids = _init_centroids(src, k, seed)
    d = centroids.shape[1]
    inertia_trace: list[float] = []

    for _ in range(max_iter):
        bc = sc.broadcast(centroids)

        def partial_sums(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            C = bc.value
            kk, dd = C.shape
            sums = np.zeros((kk, dd))
            counts = np.zeros(kk)
            sse = 0.0
            for pdf in batches:
                if not len(pdf):
                    continue
                X = np.vstack([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
                # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2 ; argmin over c
                d2 = (
                    (X * X).sum(axis=1)[:, None]
                    - 2.0 * (X @ C.T)
                    + (C * C).sum(axis=1)[None, :]
                )
                a = np.argmin(d2, axis=1)
                sse += float(d2[np.arange(len(a)), a].sum())
                np.add.at(sums, a, X)
                np.add.at(counts, a, 1.0)
            nz = np.nonzero(counts)[0]
            clusters = np.concatenate([np.repeat(nz, d), nz, [-1]]).astype(np.int32)
            pos = np.concatenate(
                [np.tile(np.arange(d), len(nz)), np.full(len(nz), COUNT_POS), [COUNT_POS]]
            ).astype(np.int32)
            vals = np.concatenate([sums[nz].ravel(), counts[nz], [sse]])
            # last row (cluster=-1) is the sse side channel
            yield pd.DataFrame({"cluster": clusters, "pos": pos, "val": vals})

        agg = (
            src.mapInPandas(partial_sums, schema="cluster int, pos int, val double")
            .groupBy("cluster", "pos")
            .agg(F.sum("val").alias("val"))
            .collect()
        )
        bc.unpersist()
        sums = np.zeros((k, d))
        counts = np.zeros(k)
        sse = 0.0
        for r in agg:
            if r.cluster == -1:
                sse = r.val
            elif r.pos == COUNT_POS:
                counts[r.cluster] = r.val
            else:
                sums[r.cluster, r.pos] = r.val
        inertia_trace.append(sse)
        new_centroids = centroids.copy()  # empty clusters keep their old position
        nz = counts > 0
        new_centroids[nz] = sums[nz] / counts[nz, None]
        shift = float(np.linalg.norm(new_centroids - centroids))
        centroids = new_centroids
        if shift < tol:
            break
    return centroids, inertia_trace


def assign_clusters(
    embeddings: DataFrame, centroids: np.ndarray, include_vector: bool = False
) -> DataFrame:
    """(vec_id, cluster[, cv]) assignment via broadcast GEMM. Passing the
    vector through avoids a corpus self-join when the caller needs both."""
    sc = embeddings.sparkSession.sparkContext
    bc = sc.broadcast(centroids)

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        C = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.vstack([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
            d2 = (X * X).sum(axis=1)[:, None] - 2.0 * (X @ C.T) + (C * C).sum(axis=1)[None, :]
            out = {
                "vec_id": pdf["vec_id"].to_numpy(),
                "cluster": np.argmin(d2, axis=1).astype(np.int32),
            }
            if include_vector:
                out["cv"] = [list(map(float, x)) for x in X]
            yield pd.DataFrame(out)

    schema = "vec_id bigint, cluster int" + (", cv array<double>" if include_vector else "")
    return embeddings.select("vec_id", "embedding").mapInPandas(assign, schema=schema)


def knn_ivf_kmeans(
    embeddings: DataFrame,
    n_queries: int = 5,
    k: int = 5,
    n_clusters: int = 16,
    n_probe: int = 4,
    train_iter: int = 5,
    seed: int = 7,
) -> DataFrame:
    """Approximate cosine top-k with a trained IVF index.

    queries = vec_id < n_queries (as in knn_brute); each probes its
    ``n_probe`` nearest centroid cells. The candidate join is an equi-join
    on cluster id between the corpus assignment and the broadcast probe
    list; only candidates get the exact cosine. Output schema matches
    :func:`similarity.knn_brute` (q_id, c_id, cos, rk) for recall tests.
    """
    spark = embeddings.sparkSession
    centroids, _ = kmeans_fit(embeddings, k=n_clusters, max_iter=train_iter, seed=seed)
    corpus = embeddings.filter(F.col("vec_id") >= n_queries)
    assigned = assign_clusters(corpus, centroids, include_vector=True)

    q_rows = embeddings.filter(F.col("vec_id") < n_queries).select("vec_id", "embedding").collect()
    probes = []
    for r in q_rows:
        qv = np.asarray(r.embedding, dtype=np.float64)
        d2 = ((centroids - qv) ** 2).sum(axis=1)
        for c in np.argsort(d2)[:n_probe]:
            probes.append((int(r.vec_id), list(map(float, qv)), int(c)))
    probe_df = spark.createDataFrame(probes, schema="q_id bigint, qv array<double>, cluster int")

    dot = F.aggregate(
        F.zip_with(F.col("qv"), F.col("cv"), lambda a, b: a * b), F.lit(0.0), lambda s, x: s + x
    )
    nrm = lambda c: F.sqrt(F.aggregate(c, F.lit(0.0), lambda s, x: s + x * x))  # noqa: E731
    scored = (
        assigned.join(F.broadcast(probe_df), "cluster")
        .withColumn("cos", F.round(dot / (nrm(F.col("qv")) * nrm(F.col("cv"))), 6))
        .select(F.col("q_id"), F.col("vec_id").alias("c_id"), "cos")
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("c_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("q_id", "c_id", "cos", "rk")
    )


def kmeans_parity_sql(
    dialect: str,
    k: int = 4,
    iters: int = 3,
    seed: int = 11,
    d: int = 64,
    centroid_round: int = 9,
) -> str:
    """Generate the SAME unrolled Lloyd k-means for both engines — the
    clustering analogue of ``graph.pagerank_docs_sql``'s fixed-iteration
    CTE unroll, pinning assignment (argmin with a deterministic
    cluster-asc tie-break), the M-step mean, empty-cluster carry-forward,
    and the inertia readout end-to-end DuckDB-exact.

    Why it CAN be exact, term by term:

    - init: the k vectors with the smallest portable hash of
      "vec_id:seed" (sampling._keyed_hash convention) — integer order,
      engine-independent;
    - distances: one generated left-associated chain
      ``(x1-c1)*(x1-c1) + ...`` — both engines parse ``a+b+c`` left-assoc
      and run the identical IEEE double ops on the identical literals, so
      d2 is BITWISE equal (no engine-private GEMM reorderings — this
      parity twin deliberately avoids the numpy kernel);
    - argmin: ROW_NUMBER ordered by (d2, cluster) — bitwise-equal keys
      make the pick deterministic on both sides;
    - M-step: per-dimension AVG — the one place summation ORDER differs
      between engines (shuffle order vs scan order), absorbed by rounding
      every centroid coordinate to ``centroid_round`` decimals each
      iteration (1e-9 against ~1e-17 ulp noise; the rounding IS the
      published contract of this parity variant, not a fudge);
    - readout: per-cluster count + avg d2 rounded to 6.

    ``dialect``: 'spark' or 'duckdb' — the only splits are array indexing
    (0- vs 1-based), float->double cast spelling, and the md5 hash idiom.
    Everything downstream of the ``vecs`` CTE is byte-identical SQL.
    """
    if dialect == "spark":
        xcols = ", ".join(
            f"CAST(embedding[{i - 1}] AS DOUBLE) AS x{i}" for i in range(1, d + 1)
        )
        h = "CAST(conv(substring(md5(concat(CAST(vec_id AS STRING), ':" + str(seed) + "')), 1, 15), 16, 10) AS BIGINT)"
    elif dialect == "duckdb":
        xcols = ", ".join(f"embedding[{i}]::DOUBLE AS x{i}" for i in range(1, d + 1))
        h = "('0x' || substr(md5(vec_id::VARCHAR || ':" + str(seed) + "'), 1, 15))::BIGINT"
    else:
        raise ValueError(f"dialect must be 'spark' or 'duckdb', got {dialect!r}")

    d2 = " + ".join(f"(x{i} - c{i}) * (x{i} - c{i})" for i in range(1, d + 1))
    c0_cols = ", ".join(f"x{i} AS c{i}" for i in range(1, d + 1))
    stages = [
        f"""vecs AS (SELECT vec_id, {xcols} FROM embeddings),
hashed AS (SELECT vec_id, {h} AS hh FROM embeddings),
c0 AS (
  SELECT ROW_NUMBER() OVER (ORDER BY hh, vec_id) - 1 AS cluster, {c0_cols}
  FROM vecs JOIN hashed USING (vec_id)
  ORDER BY hh, vec_id LIMIT {k}
)"""
    ]
    for t in range(1, iters + 1):
        mean_cols = ", ".join(
            f"round(avg(x{i}), {centroid_round}) AS c{i}" for i in range(1, d + 1)
        )
        carry_cols = ", ".join(
            f"coalesce(m.c{i}, p.c{i}) AS c{i}" for i in range(1, d + 1)
        )
        stages.append(f"""a{t} AS (
  SELECT vec_id, cluster, d2 FROM (
    SELECT v.vec_id, c.cluster, {d2} AS d2,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY {d2} ASC, c.cluster ASC) AS rn
    FROM vecs v CROSS JOIN c{t - 1} c
  ) ranked WHERE rn = 1
)""")
        if t < iters:
            stages.append(f"""m{t} AS (
  SELECT cluster, {mean_cols}
  FROM a{t} JOIN vecs USING (vec_id) GROUP BY cluster
),
c{t} AS (
  SELECT p.cluster, {carry_cols}
  FROM c{t - 1} p LEFT JOIN m{t} m ON m.cluster = p.cluster
)""")
    unrolled = ",\n".join(stages)
    return f"""
WITH {unrolled}
SELECT cluster, count(*) AS n, round(avg(d2), 6) AS avg_d2
FROM a{iters}
GROUP BY cluster
ORDER BY cluster
"""


def kmeans_parity(
    spark,
    embeddings: DataFrame,
    k: int = 4,
    iters: int = 3,
    seed: int = 11,
    d: int = 64,
    centroid_round: int = 9,
) -> DataFrame:
    """Run the Spark dialect of :func:`kmeans_parity_sql` over the given
    embeddings frame — STEPWISE. Spark inlines every CTE reference, so
    the single unrolled query (which DuckDB executes as-is for the
    oracle) re-expanded the whole a{t}→c{t-1} chain per step: 48
    Exchanges / 30 duplicate parquet scans at iters=3 (r14 optimization
    round, guide §3.3 truncate-the-plan). Here ``vecs`` (vec_id + d
    doubles) is materialized ONCE (localCheckpoint) and each Lloyd
    iteration runs assign→mean→carry as its own query against it, with
    the k-row centroid frame checkpointed between steps. Per-stage SQL
    text is the generator's verbatim; every centroid coordinate is
    rounded to ``centroid_round`` each iteration by the face's own
    cross-engine design, so execution/summation-order differences cannot
    reach the output — the same argument that makes the face DuckDB-exact
    makes the stepwise plan value-identical to the inlined one. Proven
    hash-exact against the unchanged oracle after the rewrite.

    The numpy-kernel :func:`kmeans_fit` stays the throughput path; this
    twin exists to pin Lloyd's SEMANTICS against DuckDB exactly."""
    embeddings.createOrReplaceTempView("embeddings")
    xcols = ", ".join(
        f"CAST(embedding[{i - 1}] AS DOUBLE) AS x{i}" for i in range(1, d + 1)
    )
    h = (
        "CAST(conv(substring(md5(concat(CAST(vec_id AS STRING), ':"
        + str(seed)
        + "')), 1, 15), 16, 10) AS BIGINT)"
    )
    d2 = " + ".join(f"(x{i} - c{i}) * (x{i} - c{i})" for i in range(1, d + 1))
    c0_cols = ", ".join(f"x{i} AS c{i}" for i in range(1, d + 1))
    mean_cols = ", ".join(
        f"round(avg(x{i}), {centroid_round}) AS c{i}" for i in range(1, d + 1)
    )
    carry_cols = ", ".join(
        f"coalesce(m.c{i}, p.c{i}) AS c{i}" for i in range(1, d + 1)
    )
    vecs = spark.sql(
        f"SELECT vec_id, {xcols} FROM embeddings"
    ).localCheckpoint(eager=False)
    vecs.createOrReplaceTempView("kmeans_parity_vecs")
    spark.sql(
        f"""WITH hashed AS (SELECT vec_id, {h} AS hh FROM embeddings)
SELECT ROW_NUMBER() OVER (ORDER BY hh, vec_id) - 1 AS cluster, {c0_cols}
FROM kmeans_parity_vecs JOIN hashed USING (vec_id)
ORDER BY hh, vec_id LIMIT {k}"""
    ).localCheckpoint(eager=True).createOrReplaceTempView("kmeans_parity_c")
    assign = f"""a AS (
  SELECT vec_id, cluster, d2 FROM (
    SELECT v.vec_id, c.cluster, {d2} AS d2,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY {d2} ASC, c.cluster ASC) AS rn
    FROM kmeans_parity_vecs v CROSS JOIN kmeans_parity_c c
  ) ranked WHERE rn = 1
)"""
    for _ in range(1, iters):
        c = spark.sql(
            f"""WITH {assign},
m AS (
  SELECT cluster, {mean_cols}
  FROM a JOIN kmeans_parity_vecs USING (vec_id) GROUP BY cluster
)
SELECT p.cluster, {carry_cols}
FROM kmeans_parity_c p LEFT JOIN m ON m.cluster = p.cluster"""
        ).localCheckpoint(eager=True)
        c.createOrReplaceTempView("kmeans_parity_c")
    return spark.sql(
        f"""WITH {assign}
SELECT cluster, count(*) AS n, round(avg(d2), 6) AS avg_d2
FROM a
GROUP BY cluster
ORDER BY cluster"""
    )
