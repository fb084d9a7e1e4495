"""Product-quantization ANN (operators/pq.py): NumPy codebook oracle for a
single Lloyd step, encode determinism, ADC math, and recall vs brute force."""

import numpy as np
import pytest

from baum_welch_spark.operators.pq import knn_pq, pq_encode, pq_train
from baum_welch_spark.operators.similarity import knn_brute
from baum_welch_spark.sources.io import load_table

from conftest import SF0001


@pytest.fixture(scope="module")
def embeddings(spark):
    return load_table(spark, SF0001, "embeddings").cache()


def _norm_matrix(embeddings):
    pdf = embeddings.select("vec_id", "embedding").toPandas().sort_values("vec_id")
    ids = pdf["vec_id"].to_numpy()
    M = np.vstack([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
    M = M / np.linalg.norm(M, axis=1, keepdims=True)
    return ids, M


def test_pq_train_shapes_and_determinism(spark, embeddings):
    b1 = pq_train(embeddings, m=8, n_codes=16, max_iter=3)
    b2 = pq_train(embeddings, m=8, n_codes=16, max_iter=3)
    assert b1.shape == (8, 16, 8)
    np.testing.assert_array_equal(b1, b2)


def test_pq_codebooks_match_numpy_lloyd(spark, embeddings):
    """One distributed Lloyd step == one in-memory Lloyd step from the same
    seeds (the kmeans_fit oracle pattern, per subspace)."""
    from baum_welch_spark.operators.pq import _normalized, _seed_codebooks

    src = _normalized(embeddings)
    seeds = _seed_codebooks(src, m=8, n_codes=16, seed=7)
    spark_books = pq_train(embeddings, m=8, n_codes=16, max_iter=1)
    _, M = _norm_matrix(embeddings)
    ds = M.shape[1] // 8
    for j in range(8):
        S = M[:, j * ds : (j + 1) * ds]
        C = seeds[j]
        d2 = (S * S).sum(1)[:, None] - 2 * S @ C.T + (C * C).sum(1)[None, :]
        a = np.argmin(d2, axis=1)
        expect = C.copy()
        for c in range(16):
            if (a == c).any():
                expect[c] = S[a == c].mean(axis=0)
        np.testing.assert_allclose(spark_books[j], expect, atol=1e-9)


def test_pq_encode_matches_numpy(spark, embeddings):
    books = pq_train(embeddings, m=8, n_codes=16, max_iter=2)
    codes = {
        r.vec_id: list(r.codes) for r in pq_encode(embeddings, books).collect()
    }
    ids, M = _norm_matrix(embeddings)
    ds = M.shape[1] // 8
    for i, vid in enumerate(ids[:50]):
        for j in range(8):
            S = M[i, j * ds : (j + 1) * ds]
            d2 = ((books[j] - S[None, :]) ** 2).sum(axis=1)
            assert codes[vid][j] == int(np.argmin(d2))


def test_knn_pq_recall_vs_brute(spark, embeddings):
    brute = {(r.q_id, r.c_id) for r in knn_brute(embeddings, n_queries=5, k=5).collect()}
    pq = knn_pq(embeddings, n_queries=5, k=5, m=8, n_codes=16).collect()
    hits = {(r.q_id, r.c_id) for r in pq}
    recall = len(brute & hits) / len(brute)
    assert recall >= 0.5, f"PQ recall {recall}"
    # every query returns exactly k ranked candidates with rk dense from 1
    by_q = {}
    for r in pq:
        by_q.setdefault(r.q_id, []).append(r.rk)
    assert set(by_q) == {0, 1, 2, 3, 4}
    for rks in by_q.values():
        assert sorted(rks) == [1, 2, 3, 4, 5]


def test_pq_train_scans_persisted_frame_once_per_iter(spark, embeddings, monkeypatch):
    # Scale-posture pin (VERDICT-r5 #5): every training iteration must be
    # ONE scan of the persisted normalized frame (InMemoryTableScan) with a
    # single exchange (the partial-agg combine of model-sized stats) — no
    # re-derivation from parquet, no extra shuffle. Captured by spying on
    # DataFrame.collect, which the loop calls once per iteration.
    from pyspark.sql.classic.dataframe import DataFrame  # concrete class in pyspark 4

    from baum_welch_spark.plans.audit import _shuffle_count, explain_str

    captured = []
    orig = DataFrame.collect

    def spy(self):
        captured.append(explain_str(self, "simple"))
        return orig(self)

    monkeypatch.setattr(DataFrame, "collect", spy)
    pq_train(embeddings, m=2, n_codes=4, max_iter=3, tol=0.0)
    iter_plans = [p for p in captured if "MapInPandas" in p]
    assert len(iter_plans) == 3, f"expected 3 training-iteration collects, saw {len(iter_plans)}"
    for p in iter_plans:
        assert "InMemoryTableScan" in p, f"iteration re-derives its input instead of reading cache:\n{p}"
        assert _shuffle_count(p) <= 1, f"iteration plans extra shuffles:\n{p}"


def test_ivfpq_encode_cells_and_codes_shapes(spark, embeddings):
    from baum_welch_spark.operators.pq import ivfpq_encode, ivfpq_train

    centroids, books = ivfpq_train(embeddings, n_cells=4, m=2, n_codes=4)
    assert centroids.shape[0] == 4 and books.shape == (2, 4, centroids.shape[1] // 2)
    enc = ivfpq_encode(embeddings, centroids, books).collect()
    assert len(enc) == embeddings.count()
    assert all(0 <= r.cell < 4 and len(r.codes) == 2 for r in enc)
    assert all(all(0 <= c < 4 for c in r.codes) for r in enc)
    # every vector's cell must be its true nearest centroid
    ids, M = _norm_matrix(embeddings)
    d2 = ((M[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
    truth = dict(zip(ids, d2.argmin(axis=1)))
    for r in enc:
        assert r.cell == truth[r.vec_id]


def test_ivfpq_residual_codes_beat_flat_pq_distortion(spark, embeddings):
    # The point of residual encoding: reconstruction error of IVF-PQ
    # (centroid + decoded residual) must undercut flat PQ with the same
    # code budget. Computed in NumPy from the trained models.
    from baum_welch_spark.operators.pq import ivfpq_train

    ids, M = _norm_matrix(embeddings)
    centroids, books = ivfpq_train(embeddings, n_cells=8, m=8, n_codes=16)
    flat_books = pq_train(embeddings, m=8, n_codes=16)

    def distortion(X, B, base=None):
        mm, kk, dd = B.shape
        R = X if base is None else X - base
        err = 0.0
        for j in range(mm):
            S = R[:, j * dd : (j + 1) * dd]
            d2 = ((S[:, None, :] - B[j][None, :, :]) ** 2).sum(axis=2)
            err += float(d2.min(axis=1).sum())
        return err

    cell = ((M[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
    ivf_err = distortion(M, books, base=centroids[cell])
    flat_err = distortion(M, flat_books)
    assert ivf_err < flat_err, (ivf_err, flat_err)


def test_knn_ivfpq_recall_vs_brute(spark, embeddings):
    from baum_welch_spark.operators.pq import knn_ivfpq

    brute = {(r.q_id, r.c_id) for r in knn_brute(embeddings, n_queries=5, k=5).collect()}
    got = knn_ivfpq(embeddings, n_queries=5, k=5, n_cells=8, n_probe=4).collect()
    hits = {(r.q_id, r.c_id) for r in got}
    recall = len(brute & hits) / len(brute)
    assert recall >= 0.5, f"IVF-PQ recall {recall}"
    by_q = {}
    for r in got:
        by_q.setdefault(r.q_id, []).append(r.rk)
    assert set(by_q) == {0, 1, 2, 3, 4}
    for rks in by_q.values():
        assert sorted(rks) == list(range(1, len(rks) + 1))


def test_ivfpq_index_roundtrip_and_partition_pruned_query(spark, embeddings, tmp_path):
    from baum_welch_spark.operators.pq import (
        ivfpq_read_index,
        ivfpq_write_index,
        knn_ivfpq,
        knn_ivfpq_query,
    )
    from baum_welch_spark.plans.audit import explain_str

    path = str(tmp_path / "ivfpq_index")
    centroids, books = ivfpq_write_index(embeddings, path, n_cells=8, m=2, n_codes=4)
    c2, b2, codes = ivfpq_read_index(spark, path)
    np.testing.assert_array_equal(centroids, c2)
    np.testing.assert_array_equal(books, b2)
    assert codes.count() == embeddings.count()

    qdf = embeddings.filter("vec_id < 5")
    cdf = embeddings.filter("vec_id >= 5")
    # the serving search must partition-prune the cell-partitioned codes:
    # the cell IN (...) predicate appears as a PartitionFilter on the scan
    got = knn_ivfpq_query(spark, path, qdf, cdf, k=5, n_probe=3)
    plan = explain_str(got, "formatted")
    assert "PartitionFilters" in plan and "cell" in plan.split("PartitionFilters", 1)[1][:200]
    rows = got.collect()
    by_q = {}
    for r in rows:
        # the index contains the query vectors too (vec_id < 5 were encoded);
        # the rerank side excludes them, so no self-hits
        assert r.c_id >= 5
        by_q.setdefault(r.q_id, []).append(r.rk)
    assert set(by_q) == {0, 1, 2, 3, 4}
    # index-served search agrees with the train-inline search wherever the
    # probed cells match (same models, same seed -> identical by construction
    # except the inline variant trains on all embeddings; both must at least
    # return well-formed dense rankings)
    for rks in by_q.values():
        assert sorted(rks) == list(range(1, len(rks) + 1))


def test_ivfpq_append_serves_new_vectors_without_touching_old_files(spark, embeddings):
    """Append-time index maintenance: new vectors become searchable, old
    cell files stay byte-identical, and only cells receiving new codes
    gain files."""
    import os

    from baum_welch_spark.operators.pq import (
        ivfpq_append,
        ivfpq_write_index,
        knn_ivfpq_query,
    )
    from pyspark.sql import functions as F

    base = embeddings.filter(F.col("vec_id") % 2 == 0)
    extra = embeddings.filter(F.col("vec_id") % 2 == 1)
    path = str(spark._jvm.java.lang.System.getProperty("java.io.tmpdir")) + "/ivfpq_append_idx"
    import shutil

    shutil.rmtree(path, ignore_errors=True)
    ivfpq_write_index(base, path)

    def files():
        out = {}
        root = f"{path}/codes"
        for d in sorted(os.listdir(root)):
            if not d.startswith("cell="):
                continue
            for fn in sorted(os.listdir(f"{root}/{d}")):
                if fn.endswith(".parquet"):
                    p = f"{root}/{d}/{fn}"
                    out[p] = os.path.getsize(p)
        return out

    before = files()
    ivfpq_append(spark, path, extra)
    after = files()
    # old files untouched (same paths, same sizes), new files appended
    assert set(before) <= set(after)
    assert all(after[p] == sz for p, sz in before.items())
    assert len(after) > len(before)
    # an odd vector queried against the appended index must now find
    # itself (its own code is in the probed cells; self-match at cos ~1)
    q = extra.orderBy("vec_id").limit(3)
    res = knn_ivfpq_query(spark, path, q, embeddings, k=3, n_probe=4).collect()
    by_q = {}
    for r in res:
        by_q.setdefault(r.q_id, []).append(r.c_id)
    assert by_q and all(qid in cs for qid, cs in by_q.items())


def test_ivfpq_append_face_lifecycle(spark, embeddings):
    """The r8 driver face: build on evens, append odds, search — every
    query vector (which is in the corpus) must retrieve itself at rank 1
    (cos ~ 1 self-match survives ADC + exact re-rank)."""
    from baum_welch_spark.operators.pq import ivfpq_append_face

    res = ivfpq_append_face(spark, embeddings, k=3, n_probe=4).collect()
    top = {}
    for r in res:
        if r.q_id not in top or r.cos > top[r.q_id][1]:
            top[r.q_id] = (r.c_id, r.cos)
    assert top and all(cid == qid for qid, (cid, _) in top.items()), top


def test_knn_ivfpq_query_chunked_equals_unchunked(spark, embeddings, tmp_path):
    """The chunked serving path (r11: per-chunk LUT broadcasts bounded by
    chunk_size) must return exactly the unchunked result — each query's
    probe set, ADC candidates, and exact-rerank are independent of which
    chunk it rides in. Q=9 with chunk_size=2 forces 5 chunks including a
    ragged tail."""
    from baum_welch_spark.operators.pq import ivfpq_write_index, knn_ivfpq_query

    path = str(tmp_path / "ivfpq_chunk")
    ivfpq_write_index(embeddings, path, n_cells=8, m=2, n_codes=4)
    qdf = embeddings.filter("vec_id < 9")
    cdf = embeddings.filter("vec_id >= 9")
    one = knn_ivfpq_query(spark, path, qdf, cdf, k=5, n_probe=3, chunk_size=10_000)
    many = knn_ivfpq_query(spark, path, qdf, cdf, k=5, n_probe=3, chunk_size=2)
    rows_one = sorted(tuple(r) for r in one.collect())
    rows_many = sorted(tuple(r) for r in many.collect())
    assert rows_one == rows_many
    assert len({q for q, _, _, _ in rows_one}) == 9
