"""int8 scalar quantization tests: code validity, reconstruction error
bound, and quantized-kNN recall against the exact baseline."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from baum_welch_spark.operators.quantize import emb_quantize, knn_quantized
from baum_welch_spark.operators.similarity import knn_brute
from baum_welch_spark.sources.io import load_table

from conftest import SF0001


@pytest.fixture(scope="module")
def embeddings(spark):
    return load_table(spark, SF0001, "embeddings").cache()


def test_codes_in_range_and_deterministic(spark, embeddings):
    out1 = emb_quantize(embeddings).collect()
    out2 = emb_quantize(embeddings.repartition(7)).collect()
    assert sorted((r.vec_id, r.codes_str) for r in out1) == sorted(
        (r.vec_id, r.codes_str) for r in out2
    )
    dim = len(embeddings.first()["embedding"])
    for r in out1[:50]:
        codes = [int(c) for c in r.codes_str.split(",")]
        assert len(codes) == dim
        assert all(0 <= c <= 255 for c in codes)
    # the full code range is actually used (min -> 0, max -> 255 per dim)
    all_codes = np.array([[int(c) for c in r.codes_str.split(",")] for r in out1])
    assert all_codes.min(axis=0).max() == 0
    assert all_codes.max(axis=0).min() == 255


def test_reconstruction_error_bounded_by_half_step(spark, embeddings):
    rows = embeddings.select("vec_id", F.col("embedding").cast("array<double>").alias("v")).collect()
    V = np.array([r.v for r in sorted(rows, key=lambda r: r.vec_id)])
    mn, mx = V.min(axis=0), V.max(axis=0)
    step = (mx - mn) / 255.0
    codes = {
        r.vec_id: np.array([int(c) for c in r.codes_str.split(",")])
        for r in emb_quantize(embeddings).collect()
    }
    recon = np.array([mn + codes[r.vec_id] * step for r in sorted(rows, key=lambda r: r.vec_id)])
    # scalar quantization error is at most half a step per dimension
    assert (np.abs(recon - V) <= step / 2 + 1e-12).all()


def test_quantized_knn_recall_vs_exact(spark, embeddings):
    exact = {
        (r.q_id, r.c_id) for r in knn_brute(embeddings, n_queries=5, k=5).collect()
    }
    quant = {
        (r.q_id, r.c_id) for r in knn_quantized(embeddings, n_queries=5, k=5).collect()
    }
    recall = len(exact & quant) / len(exact)
    assert recall >= 0.8, recall


def test_empty_embeddings(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert emb_quantize(empty).count() == 0
    assert knn_quantized(empty).count() == 0
