"""Product quantization (PQ) for embedding ANN — the memory-scale path.

Beyond-reference LLM-pipeline operator (the reference engine has no vector
surface; SURVEY §2.7 north star). IVF (clustering.py) prunes WHICH vectors
get scored; PQ compresses WHAT is scored: each d-dim float vector becomes
``m`` one-byte codes (one codeword index per d/m-dim subspace), a 32x
compression at d=64/m=8 that lets a 100 TB embedding corpus's index fit in
executor memory. Search uses the classic asymmetric distance computation
(ADC, Jegou et al. 2011, "Product Quantization for Nearest Neighbor
Search"): per query, a (m, n_codes) lookup table of exact
subspace-distances to every codeword, so a candidate's approximate distance
is m table adds — no float vector is ever touched at query time.

Scale posture:
- Training: ALL m codebooks train in one Lloyd loop — each iteration is a
  single ``mapInPandas`` scan emitting (subspace, cluster, pos, partial)
  rows, combined by a Catalyst partial agg; the shuffle is
  m * n_codes * (d/m + 1) rows, model-sized, independent of corpus size.
  The normalized source frame is persisted across iterations (the
  classifier-fix pattern; one corpus read total).
- Encoding: one shuffle-free ``mapInPandas`` pass with broadcast codebooks.
- Search: LUTs are query-side-only (n_queries * m * n_codes doubles,
  broadcast); candidate scoring is shuffle-free; the final per-query top-k
  is the same window ``knn_brute`` uses.

Vectors are L2-normalized first, so squared-L2 ADC order == cosine order
(``cos = 1 - d2/2``) and recall is directly comparable to ``knn_brute``.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: sentinel `pos` carrying the per-(subspace, cluster) count
_COUNT_POS = -1


def _normalized(embeddings: DataFrame) -> DataFrame:
    v = F.col("embedding").cast("array<double>")
    nrm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda s, x: s + x * x))
    return embeddings.select(
        "vec_id", F.transform(v, lambda x: x / nrm).alias("nv")
    )


def _seed_codebooks(src: DataFrame, m: int, n_codes: int, seed: int) -> np.ndarray:
    """Deterministic seeding, the clustering.py convention: the n_codes
    vectors with the smallest murmur3(vec_id, seed) seed EVERY subspace
    (their subvectors differ per subspace, so the codebooks diverge from
    iteration 1)."""
    rows = (
        src.select("vec_id", "nv", F.hash("vec_id", F.lit(seed)).alias("h"))
        .orderBy("h", "vec_id")
        .limit(n_codes)
        .collect()
    )
    if len(rows) < n_codes:
        raise ValueError(f"n_codes={n_codes} exceeds embedding rows ({len(rows)})")
    X = np.vstack([np.asarray(r.nv, dtype=np.float64) for r in rows])
    d = X.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    ds = d // m
    # (m, n_codes, ds)
    return np.stack([X[:, j * ds : (j + 1) * ds] for j in range(m)])


def pq_train(
    embeddings: DataFrame,
    m: int = 8,
    n_codes: int = 16,
    max_iter: int = 8,
    seed: int = 7,
    tol: float = 1e-6,
) -> np.ndarray:
    """Train m subspace codebooks jointly; returns (m, n_codes, d/m)."""
    src = _normalized(embeddings).persist()
    try:
        return _train_books(src, m, n_codes, max_iter, seed, tol)
    finally:
        src.unpersist()


def _train_books(
    src: DataFrame, m: int, n_codes: int, max_iter: int, seed: int, tol: float
) -> np.ndarray:
    """Codebook Lloyd loop over a caller-persisted ``(vec_id, nv)`` frame.

    Split out of :func:`pq_train` so :func:`ivfpq_train` can run the SAME
    loop over residual vectors (which must NOT be re-normalized — a
    residual's length carries the quantization error being encoded)."""
    sc = src.sparkSession.sparkContext
    books = _seed_codebooks(src, m, n_codes, seed)
    ds = books.shape[2]

    for _ in range(max_iter):
        bc = sc.broadcast(books)

        def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            B = bc.value  # (m, k, ds)
            mm, kk, dd = B.shape
            sums = np.zeros((mm, kk, dd))
            counts = np.zeros((mm, kk))
            for pdf in batches:
                if not len(pdf):
                    continue
                X = np.vstack([np.asarray(v, dtype=np.float64) for v in pdf["nv"]])
                for j in range(mm):
                    S = X[:, j * dd : (j + 1) * dd]
                    d2 = (
                        (S * S).sum(axis=1)[:, None]
                        - 2.0 * (S @ B[j].T)
                        + (B[j] * B[j]).sum(axis=1)[None, :]
                    )
                    a = np.argmin(d2, axis=1)
                    np.add.at(sums[j], a, S)
                    np.add.at(counts[j], a, 1.0)
            out = []
            for j in range(mm):
                nz = np.nonzero(counts[j])[0]
                out.append(
                    pd.DataFrame(
                        {
                            "subspace": np.repeat(j, len(nz) * dd + len(nz)).astype(np.int32),
                            "cluster": np.concatenate([np.repeat(nz, dd), nz]).astype(np.int32),
                            "pos": np.concatenate(
                                [np.tile(np.arange(dd), len(nz)), np.full(len(nz), _COUNT_POS)]
                            ).astype(np.int32),
                            "val": np.concatenate([sums[j][nz].ravel(), counts[j][nz]]),
                        }
                    )
                )
            if out:
                yield pd.concat(out, ignore_index=True)

        agg = (
            src.mapInPandas(partials, schema="subspace int, cluster int, pos int, val double")
            .groupBy("subspace", "cluster", "pos")
            .agg(F.sum("val").alias("val"))
            .collect()
        )
        bc.unpersist()
        sums = np.zeros((m, n_codes, ds))
        counts = np.zeros((m, n_codes))
        for r in agg:
            if r.pos == _COUNT_POS:
                counts[r.subspace, r.cluster] = r.val
            else:
                sums[r.subspace, r.cluster, r.pos] = r.val
        new_books = books.copy()  # empty codewords hold position
        nz = counts > 0
        new_books[nz] = sums[nz] / counts[nz][:, None]
        shift = float(np.linalg.norm(new_books - books))
        books = new_books
        if shift < tol:
            break
    return books


def pq_encode(embeddings: DataFrame, books: np.ndarray) -> DataFrame:
    """(vec_id, codes array<int>) — one shuffle-free Arrow pass."""
    sc = embeddings.sparkSession.sparkContext
    bc = sc.broadcast(books)

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        B = bc.value
        mm, kk, dd = B.shape
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.vstack([np.asarray(v, dtype=np.float64) for v in pdf["nv"]])
            codes = np.empty((len(X), mm), dtype=np.int32)
            for j in range(mm):
                S = X[:, j * dd : (j + 1) * dd]
                d2 = (
                    (S * S).sum(axis=1)[:, None]
                    - 2.0 * (S @ B[j].T)
                    + (B[j] * B[j]).sum(axis=1)[None, :]
                )
                codes[:, j] = np.argmin(d2, axis=1)
            yield pd.DataFrame({"vec_id": pdf["vec_id"].values, "codes": list(codes)})

    return _normalized(embeddings).mapInPandas(encode, schema="vec_id bigint, codes array<int>")


def knn_pq(
    embeddings: DataFrame,
    n_queries: int = 5,
    k: int = 5,
    m: int = 8,
    n_codes: int = 16,
    max_iter: int = 8,
    seed: int = 7,
    rerank: int = 50,
) -> DataFrame:
    """Approximate cosine top-k via PQ/ADC with exact re-ranking — the
    production IVFADC pipeline shape (Jegou et al. §V): ADC over the byte
    codes prunes the corpus to a per-query shortlist of ``rerank``
    candidates (compressed-domain, no float vector touched), then ONLY the
    shortlist rows fetch their real vectors for an exact cosine. At 100 TB
    the exact stage reads rerank * n_queries vectors instead of the corpus.
    Output schema matches ``knn_brute`` (q_id, c_id, cos, rk) with ``cos``
    exact, so overlapping pairs agree with the brute list bit-for-bit."""
    spark = embeddings.sparkSession
    books = pq_train(embeddings, m=m, n_codes=n_codes, max_iter=max_iter, seed=seed)
    corpus = pq_encode(embeddings.filter(F.col("vec_id") >= n_queries), books)

    q_rows = (
        _normalized(embeddings.filter(F.col("vec_id") < n_queries))
        .orderBy("vec_id")
        .collect()
    )
    # per-query LUT of exact subspace distances to every codeword
    mm, kk, dd = books.shape
    luts = np.empty((len(q_rows), mm, kk))
    q_ids = []
    for qi, r in enumerate(q_rows):
        qv = np.asarray(r.nv, dtype=np.float64)
        q_ids.append(int(r.vec_id))
        for j in range(mm):
            sub = qv[j * dd : (j + 1) * dd]
            luts[qi, j] = ((books[j] - sub[None, :]) ** 2).sum(axis=1)
    sc = spark.sparkContext
    bc = sc.broadcast((np.asarray(q_ids, dtype=np.int64), luts))

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, L = bc.value  # (Q,), (Q, m, k)
        Q = len(ids)
        flat = L.reshape(Q, mm * kk)
        for pdf in batches:
            if not len(pdf):
                continue
            C = np.vstack([np.asarray(c, dtype=np.int64) for c in pdf["codes"]])
            # offset codes into the flattened (m*k) LUT axis
            idx = C + (np.arange(mm) * kk)[None, :]
            # (N, Q): ADC distance of every candidate to every query
            d2 = flat[:, idx].sum(axis=2).T
            n = len(C)
            yield pd.DataFrame(
                {
                    "q_id": np.repeat(ids, n),
                    "c_id": np.tile(pdf["vec_id"].values, Q),
                    "adc": np.round(1.0 - d2.T.ravel() / 2.0, 6) + 0.0,
                }
            )

    scored = corpus.mapInPandas(score, schema="q_id bigint, c_id bigint, adc double")
    return _exact_rerank(embeddings, scored, q_ids, q_rows, rerank, k)


def _exact_rerank(
    embeddings: DataFrame,
    scored: DataFrame,
    q_ids: list[int],
    q_rows: list,
    rerank: int,
    k: int,
) -> DataFrame:
    """Shared tail of the compressed-domain searches: top-``rerank`` ADC
    shortlist per query, then ONLY the shortlist rows fetch their real
    vectors for an exact cosine (the query side is a broadcast
    n_queries-row frame). Output: (q_id, c_id, cos, rk) — matches
    ``knn_brute`` so overlapping pairs agree bit-for-bit."""
    spark = embeddings.sparkSession
    w = Window.partitionBy("q_id").orderBy(F.desc("adc"), F.asc("c_id"))
    shortlist = (
        scored.withColumn("srk", F.row_number().over(w))
        .filter(F.col("srk") <= rerank)
        .select("q_id", "c_id")
    )
    q_df = spark.createDataFrame(
        [(int(i), [float(x) for x in np.asarray(r.nv)]) for i, r in zip(q_ids, q_rows)],
        schema="q_id bigint, qv array<double>",
    )
    cand = _normalized(embeddings).select(
        F.col("vec_id").alias("c_id"), F.col("nv").alias("cv")
    )
    dot = F.aggregate(
        F.zip_with(F.col("qv"), F.col("cv"), lambda a, b: a * b), F.lit(0.0), lambda s, x: s + x
    )
    exact = (
        shortlist.join(cand, "c_id")
        .join(F.broadcast(q_df), "q_id")
        .withColumn("cos", F.round(dot, 6) + F.lit(0.0))
    )
    w2 = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("c_id"))
    return (
        exact.withColumn("rk", F.row_number().over(w2))
        .filter(F.col("rk") <= k)
        .select("q_id", "c_id", "cos", "rk")
    )


def _residuals(src: DataFrame, centroids: np.ndarray) -> DataFrame:
    """(vec_id, cell, nv=residual) — assign each normalized vector to its
    nearest coarse centroid and subtract it. Shuffle-free Arrow pass with
    the (n_cells, d) centroid matrix broadcast."""
    sc = src.sparkSession.sparkContext
    bc = sc.broadcast(centroids)

    def go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        C = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.vstack([np.asarray(v, dtype=np.float64) for v in pdf["nv"]])
            d2 = (
                (X * X).sum(axis=1)[:, None]
                - 2.0 * (X @ C.T)
                + (C * C).sum(axis=1)[None, :]
            )
            a = np.argmin(d2, axis=1)
            R = X - C[a]
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].values,
                    "cell": a.astype(np.int32),
                    "nv": list(R),
                }
            )

    return src.mapInPandas(go, schema="vec_id bigint, cell int, nv array<double>")


def ivfpq_train(
    embeddings: DataFrame,
    n_cells: int = 8,
    m: int = 8,
    n_codes: int = 16,
    coarse_iter: int = 6,
    pq_iter: int = 8,
    seed: int = 7,
) -> tuple[np.ndarray, np.ndarray]:
    """Train the IVF-PQ index (Jegou et al. 2011 §V, 'IVFADC'): a coarse
    k-means quantizer over the corpus plus PQ codebooks trained on the
    RESIDUALS ``x - centroid(x)``. Residuals are what the codes must
    reconstruct — they are smaller and more isotropic than raw vectors, so
    the same code budget quantizes them with far less error than flat PQ.

    Scale posture: the coarse step is ``clustering.kmeans_fit`` (one scan
    per Lloyd iteration, model-sized shuffle); the residual pass is one
    shuffle-free Arrow map over the SAME persisted normalized frame; the
    codebook loop is :func:`_train_books` over the persisted residual frame
    (one scan per iteration, model-sized shuffle). Nothing corpus-sized
    ever reaches the driver. Returns (centroids (n_cells, d),
    books (m, n_codes, d/m)).
    """
    src = _normalized(embeddings).persist()
    try:
        return _ivfpq_train_on(src, n_cells, m, n_codes, coarse_iter, pq_iter, seed)
    finally:
        src.unpersist()


def _ivfpq_train_on(
    src: DataFrame,
    n_cells: int,
    m: int,
    n_codes: int,
    coarse_iter: int,
    pq_iter: int,
    seed: int,
) -> tuple[np.ndarray, np.ndarray]:
    """ivfpq_train body over a CALLER-persisted normalized (vec_id, nv)
    frame — split out (r15) so ivfpq_write_index can share ONE persisted
    normalized frame between the training loops and the encode+write pass
    instead of re-scanning + re-normalizing the corpus for the encode."""
    from baum_welch_spark.operators.clustering import kmeans_fit

    centroids, _ = kmeans_fit(
        src.select("vec_id", F.col("nv").alias("embedding")),
        k=n_cells,
        max_iter=coarse_iter,
        seed=seed,
    )
    res = _residuals(src, centroids).persist()
    try:
        books = _train_books(res.select("vec_id", "nv"), m, n_codes, pq_iter, seed, 1e-6)
    finally:
        res.unpersist()
    return centroids, books


def ivfpq_encode(
    embeddings: DataFrame, centroids: np.ndarray, books: np.ndarray
) -> DataFrame:
    """(vec_id, cell, codes array<int>) — cell assignment, residual, and PQ
    codes in ONE shuffle-free Arrow pass (both models broadcast). At scale
    the output would be written partitioned by ``cell`` so a search probing
    n_probe cells partition-prunes the scan."""
    return _encode_normalized(_normalized(embeddings), centroids, books)


def _encode_normalized(
    src: DataFrame, centroids: np.ndarray, books: np.ndarray
) -> DataFrame:
    """ivfpq_encode body over an already-normalized (vec_id, nv) frame —
    split out (r15) so ivfpq_write_index can feed the encode from the SAME
    persisted normalized frame the training loops scanned (one corpus
    normalize pass per index build instead of two; identical per-row
    arithmetic either way)."""
    sc = src.sparkSession.sparkContext
    bc = sc.broadcast((centroids, books))
    mm, kk, dd = books.shape

    def go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        C, B = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.vstack([np.asarray(v, dtype=np.float64) for v in pdf["nv"]])
            d2c = (
                (X * X).sum(axis=1)[:, None]
                - 2.0 * (X @ C.T)
                + (C * C).sum(axis=1)[None, :]
            )
            a = np.argmin(d2c, axis=1)
            R = X - C[a]
            codes = np.empty((len(R), mm), dtype=np.int32)
            for j in range(mm):
                S = R[:, j * dd : (j + 1) * dd]
                d2 = (
                    (S * S).sum(axis=1)[:, None]
                    - 2.0 * (S @ B[j].T)
                    + (B[j] * B[j]).sum(axis=1)[None, :]
                )
                codes[:, j] = np.argmin(d2, axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].values,
                    "cell": a.astype(np.int32),
                    "codes": list(codes),
                }
            )

    return src.select("vec_id", "nv").mapInPandas(
        go, schema="vec_id bigint, cell int, codes array<int>"
    )


def knn_ivfpq(
    embeddings: DataFrame,
    n_queries: int = 5,
    k: int = 5,
    n_cells: int = 8,
    n_probe: int = 3,
    m: int = 8,
    n_codes: int = 16,
    seed: int = 7,
    rerank: int = 50,
) -> DataFrame:
    """Approximate cosine top-k via the full IVFADC pipeline: coarse cells
    prune WHICH candidates are scored (only vectors in each query's
    ``n_probe`` nearest cells), residual-PQ codes compress WHAT is scored
    (ADC over per-(query, probed-cell) LUTs), and the ADC shortlist gets an
    exact re-rank — composing the pruning of ``knn_ivf_kmeans`` with the
    compression of ``knn_pq``.

    Scale posture: LUTs are (n_queries, n_probe, m, n_codes) doubles,
    broadcast; scoring is one shuffle-free Arrow pass in which a candidate
    is touched only by queries probing its cell (with cell-partitioned
    storage this becomes partition pruning); the only shuffles are the two
    query-count-bounded top-k windows. Output schema matches ``knn_brute``.
    """
    centroids, books = ivfpq_train(
        embeddings, n_cells=n_cells, m=m, n_codes=n_codes, seed=seed
    )
    corpus = ivfpq_encode(
        embeddings.filter(F.col("vec_id") >= n_queries), centroids, books
    )
    q_rows = (
        _normalized(embeddings.filter(F.col("vec_id") < n_queries))
        .orderBy("vec_id")
        .collect()
    )
    mm, kk, dd = books.shape
    Q = len(q_rows)
    q_ids = [int(r.vec_id) for r in q_rows]
    probe = np.empty((Q, n_probe), dtype=np.int32)
    luts = np.empty((Q, n_probe, mm, kk))
    for qi, r in enumerate(q_rows):
        qv = np.asarray(r.nv, dtype=np.float64)
        d2c = ((centroids - qv[None, :]) ** 2).sum(axis=1)
        cells = np.argsort(d2c, kind="stable")[:n_probe]
        probe[qi] = cells
        for p, c in enumerate(cells):
            rq = qv - centroids[c]  # query residual w.r.t. the probed cell
            for j in range(mm):
                sub = rq[j * dd : (j + 1) * dd]
                luts[qi, p, j] = ((books[j] - sub[None, :]) ** 2).sum(axis=1)
    sc = embeddings.sparkSession.sparkContext
    bc = sc.broadcast((np.asarray(q_ids, dtype=np.int64), probe, luts))

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, P, L = bc.value  # (Q,), (Q, n_probe), (Q, n_probe, m, k)
        for pdf in batches:
            if not len(pdf):
                continue
            C = np.vstack([np.asarray(c, dtype=np.int64) for c in pdf["codes"]])
            cells = pdf["cell"].to_numpy()
            vids = pdf["vec_id"].to_numpy()
            idx = C + (np.arange(mm) * kk)[None, :]  # flatten into (m*k)
            out_q, out_c, out_a = [], [], []
            for qi in range(len(ids)):
                for p in range(P.shape[1]):
                    mask = cells == P[qi, p]
                    if not mask.any():
                        continue
                    flat = L[qi, p].reshape(mm * kk)
                    d2 = flat[idx[mask]].sum(axis=1)
                    out_q.append(np.full(int(mask.sum()), ids[qi], dtype=np.int64))
                    out_c.append(vids[mask])
                    out_a.append(np.round(1.0 - d2 / 2.0, 6) + 0.0)
            if not out_q:
                continue
            yield pd.DataFrame(
                {
                    "q_id": np.concatenate(out_q),
                    "c_id": np.concatenate(out_c),
                    "adc": np.concatenate(out_a),
                }
            )

    scored = corpus.mapInPandas(score, schema="q_id bigint, c_id bigint, adc double")
    return _exact_rerank(embeddings, scored, q_ids, q_rows, rerank, k)


def ivfpq_write_index(
    embeddings: DataFrame,
    path: str,
    n_cells: int = 8,
    m: int = 8,
    n_codes: int = 16,
    seed: int = 7,
) -> tuple[np.ndarray, np.ndarray]:
    """Build and PERSIST the IVF-PQ index — the build-once/search-many
    serving split: ``centroids``/``books`` as tidy model parquet and the
    byte codes PARTITIONED BY CELL, so a search probing ``n_probe`` cells
    partition-prunes the code scan (the on-disk analogue of an inverted
    file; at 100 TB only the probed lists are ever read)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq_file

    # one persisted normalized frame shared by the training loops AND the
    # encode+write pass (r15): the encode previously re-scanned and
    # re-normalized the corpus after ivfpq_train had already unpersisted
    # its own copy — one corpus read per index build, not two
    src = _normalized(embeddings).persist()
    try:
        centroids, books = _ivfpq_train_on(
            src, n_cells, m, n_codes, coarse_iter=6, pq_iter=8, seed=seed
        )
        mm, kk, dd = books.shape
        # model tables are driver-sized (n_cells*d + m*k*(d/m) doubles) —
        # write them with pyarrow directly instead of two one-task Spark
        # jobs, whose fixed job/commit overhead dwarfed the bytes (measured
        # ~11 s vs <0.1 s for identical files; read back identically)
        nc, d = centroids.shape
        ci, pi = np.meshgrid(np.arange(nc), np.arange(d), indexing="ij")
        os.makedirs(f"{path}/centroids", exist_ok=True)
        pq_file.write_table(
            pa.table(
                {
                    "cell": pa.array(ci.ravel(), type=pa.int32()),
                    "pos": pa.array(pi.ravel(), type=pa.int32()),
                    "val": pa.array(centroids.ravel(), type=pa.float64()),
                }
            ),
            f"{path}/centroids/part-0.parquet",
        )
        sj, sc_, sp = np.meshgrid(
            np.arange(mm), np.arange(kk), np.arange(dd), indexing="ij"
        )
        os.makedirs(f"{path}/books", exist_ok=True)
        pq_file.write_table(
            pa.table(
                {
                    "subspace": pa.array(sj.ravel(), type=pa.int32()),
                    "code": pa.array(sc_.ravel(), type=pa.int32()),
                    "pos": pa.array(sp.ravel(), type=pa.int32()),
                    "val": pa.array(books.ravel(), type=pa.float64()),
                }
            ),
            f"{path}/books/part-0.parquet",
        )
        # the encode+write ACTION runs here, while src is still persisted —
        # it reads the cached normalized vectors instead of re-scanning and
        # re-normalizing the corpus (same per-row arithmetic either way)
        _encode_normalized(src, centroids, books).write.mode(
            "overwrite"
        ).partitionBy("cell").parquet(f"{path}/codes")
        return centroids, books
    finally:
        src.unpersist()


def ivfpq_read_index(spark, path: str) -> tuple[np.ndarray, np.ndarray, DataFrame]:
    """(centroids, books, codes DataFrame) from :func:`ivfpq_write_index`.
    The model tables are driver-sized tidy parquet written by pyarrow —
    read them back with pyarrow too (r15, guide §1.4 job accounting: each
    ``spark.read.parquet(...).collect()`` of a few-hundred-row model table
    was a whole 2-stage Spark job, ~0.4 s of pure scheduling per call and
    TWO calls per read_index; a serving face pays read_index up to twice).
    Values are identical doubles either way. Codes stay a lazy
    cell-partitioned Spark frame — that side is corpus-sized."""
    import pyarrow.parquet as pq_file

    ct = pq_file.read_table(f"{path}/centroids")
    cell = ct.column("cell").to_numpy()
    cpos = ct.column("pos").to_numpy()
    cval = ct.column("val").to_numpy()
    centroids = np.zeros((int(cell.max()) + 1, int(cpos.max()) + 1))
    centroids[cell, cpos] = cval
    bt = pq_file.read_table(f"{path}/books")
    sub = bt.column("subspace").to_numpy()
    code = bt.column("code").to_numpy()
    bpos = bt.column("pos").to_numpy()
    bval = bt.column("val").to_numpy()
    books = np.zeros((int(sub.max()) + 1, int(code.max()) + 1, int(bpos.max()) + 1))
    books[sub, code, bpos] = bval
    return centroids, books, spark.read.parquet(f"{path}/codes")


def _ivfpq_score_chunk(spark, codes, chunk_rows, chunk_ids, centroids, books, n_probe):
    """ADC-score one bounded query chunk against the cell-partitioned code
    files: probe each query's n_probe nearest cells, broadcast the chunk's
    (ids, probe, LUT) tensors, and emit (q_id, c_id, adc) for the probed
    cells only — the ``cell IN (...)`` filter partition-prunes the scan to
    the chunk's cells."""
    mm, kk, dd = books.shape
    Q = len(chunk_rows)
    probe = np.empty((Q, n_probe), dtype=np.int32)
    luts = np.empty((Q, n_probe, mm, kk))
    for qi, r in enumerate(chunk_rows):
        qv = np.asarray(r.nv, dtype=np.float64)
        d2c = ((centroids - qv[None, :]) ** 2).sum(axis=1)
        cells = np.argsort(d2c, kind="stable")[:n_probe]
        probe[qi] = cells
        for p, c in enumerate(cells):
            rq = qv - centroids[c]
            for j in range(mm):
                sub = rq[j * dd : (j + 1) * dd]
                luts[qi, p, j] = ((books[j] - sub[None, :]) ** 2).sum(axis=1)
    probed_cells = sorted({int(c) for c in probe.ravel()})
    # the partition-pruning filter: only probed cells' files are read
    pruned = codes.filter(F.col("cell").isin(probed_cells))
    bc = spark.sparkContext.broadcast(
        (np.asarray(chunk_ids, dtype=np.int64), probe, luts)
    )

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, P, L = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            C = np.vstack([np.asarray(c, dtype=np.int64) for c in pdf["codes"]])
            cells = pdf["cell"].to_numpy()
            vids = pdf["vec_id"].to_numpy()
            idx = C + (np.arange(mm) * kk)[None, :]
            out_q, out_c, out_a = [], [], []
            for qi in range(len(ids)):
                for p in range(P.shape[1]):
                    mask = cells == P[qi, p]
                    if not mask.any():
                        continue
                    flat = L[qi, p].reshape(mm * kk)
                    d2 = flat[idx[mask]].sum(axis=1)
                    out_q.append(np.full(int(mask.sum()), ids[qi], dtype=np.int64))
                    out_c.append(vids[mask])
                    out_a.append(np.round(1.0 - d2 / 2.0, 6) + 0.0)
            if not out_q:
                continue
            yield pd.DataFrame(
                {
                    "q_id": np.concatenate(out_q),
                    "c_id": np.concatenate(out_c),
                    "adc": np.concatenate(out_a),
                }
            )

    return pruned.mapInPandas(score, schema="q_id bigint, c_id bigint, adc double")


def knn_ivfpq_query(
    spark,
    index_path: str,
    query_embeddings: DataFrame,
    corpus_embeddings: DataFrame,
    k: int = 5,
    n_probe: int = 3,
    rerank: int = 50,
    chunk_size: int = 1024,
) -> DataFrame:
    """Search a PREBUILT IVF-PQ index (no training): probe each query's
    ``n_probe`` nearest cells — the ``cell IN (...)`` filter partition-
    prunes the cell-partitioned code files — ADC-score only the surviving
    codes, exact-rerank the shortlist against ``corpus_embeddings``.
    Queries are (vec_id, embedding) rows; output matches ``knn_brute``.

    Serving contract: the query batch streams through the probe/LUT/score
    path in driver-side chunks of ``chunk_size`` (VERDICT-r10 #4) — each
    chunk broadcasts its own (chunk × n_probe × m × k) LUT tensor, so peak
    broadcast size is bounded by the chunk, not the batch: a 10⁵-query
    batch is ~100 sequential ~50 MB broadcasts instead of one multi-GB one.
    Chunk results are a plan-level union feeding ONE shared shortlist +
    exact-rerank tail, and each chunk's scan stays pruned to its own probed
    cells. Results are chunk-invariant (each query's candidate set and
    scores are independent of its neighbors; pinned in tests/test_pq.py)."""
    centroids, books, codes = ivfpq_read_index(spark, index_path)
    q_rows = _normalized(query_embeddings).orderBy("vec_id").collect()
    q_ids = [int(r.vec_id) for r in q_rows]
    if not q_rows:
        # empty query batch: the chunk loop would never run (review r11) —
        # return the empty result frame the pre-chunking path produced
        return spark.createDataFrame(
            [], "q_id bigint, c_id bigint, cos double, rk int"
        )
    scored = None
    for lo in range(0, len(q_rows), chunk_size):
        part = _ivfpq_score_chunk(
            spark,
            codes,
            q_rows[lo : lo + chunk_size],
            q_ids[lo : lo + chunk_size],
            centroids,
            books,
            n_probe,
        )
        scored = part if scored is None else scored.unionByName(part)
    return _exact_rerank(corpus_embeddings, scored, q_ids, q_rows, rerank, k)


def ivfpq_serve_face(
    spark, embeddings: DataFrame, n_queries: int = 5, k: int = 5, n_probe: int = 3
) -> DataFrame:
    """Driver-contract face for the build-once/search-many serving split:
    persist a fresh IVF-PQ index to disk (``ivfpq_write_index`` — codes
    PARTITIONED BY CELL), then answer the standard 5-query board through
    :func:`knn_ivfpq_query`, whose ``cell IN (probed)`` filter partition-
    prunes the code scan (asserted in tests/test_pq.py). Rows-only by
    nature (k-means + residual-PQ training); pytest pins recall >= 0.5 vs
    knn_brute and the pruned-scan plan shape. The index lands in a fresh
    scratch directory each run — alive through the driver's lazy collect,
    removed at process exit (session.scratch_dir)."""
    from baum_welch_spark.session import scratch_dir

    path = scratch_dir("bw_ivfpq_index_")
    ivfpq_write_index(embeddings, path)
    queries = embeddings.orderBy("vec_id").limit(n_queries)
    return knn_ivfpq_query(
        spark, path, queries, embeddings, k=k, n_probe=n_probe
    )


def ivfpq_append(spark, path: str, new_embeddings: DataFrame) -> None:
    """Incremental index maintenance: encode NEW vectors with the index's
    EXISTING centroids/codebooks and append them to the cell-partitioned
    code files — the standard IVF lifecycle (Jegou 2011 serving practice:
    codebooks are trained rarely, postings lists grow continuously; a
    quantizer retrain is a full rebuild, an insert is an append).

    Scale posture: one shuffle-free mapInPandas encode pass over the new
    vectors + an APPEND write that creates files only under the cells the
    new vectors land in — existing code files are never touched (the same
    untouched-files property as the bucketed CDC snapshot; asserted in
    tests). Codebook drift is the declared trade: vectors far from the
    trained distribution get coarser codes, and the exact re-rank stage
    absorbs the error until the next rebuild."""
    centroids, books, _ = ivfpq_read_index(spark, path)
    ivfpq_encode(new_embeddings, centroids, books).write.mode("append").partitionBy(
        "cell"
    ).parquet(f"{path}/codes")


def ivfpq_append_face(
    spark, embeddings: DataFrame, k: int = 5, n_probe: int = 3, n_queries: int = 5
) -> DataFrame:
    """Driver-contract face for the full serving LIFECYCLE: build the
    IVF-PQ index on HALF the corpus (even vec_ids), :func:`ivfpq_append`
    the odd half with the frozen codebooks, then answer the standard
    query board against the grown index — the build → append → search path
    end-to-end under the driver (VERDICT-r7 #5). Rows-only by nature
    (k-means + residual-PQ training); pytest separately pins that the
    append leaves existing code files byte-identical and that appended
    vectors are retrievable (tests/test_pq.py)."""
    from baum_welch_spark.session import scratch_dir
    from pyspark.sql import functions as F

    path = scratch_dir("bw_ivfpq_append_")
    ivfpq_write_index(embeddings.filter(F.col("vec_id") % 2 == 0), path)
    ivfpq_append(spark, path, embeddings.filter(F.col("vec_id") % 2 == 1))
    queries = embeddings.orderBy("vec_id").limit(n_queries)
    return knn_ivfpq_query(spark, path, queries, embeddings, k=k, n_probe=n_probe)
