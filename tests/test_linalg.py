"""Distributed covariance / PCA tests: NumPy ground-truth parity for the
Gram reduction and the spectral properties (component variance ordering,
orthogonal projections) for the PCA face."""

import numpy as np
import pytest

from baum_welch_spark.operators.linalg import emb_covariance, emb_pca, pca_components
from baum_welch_spark.sources.io import load_table

from conftest import SF0001


@pytest.fixture(scope="module")
def embeddings(spark):
    return load_table(spark, SF0001, "embeddings").cache()


def _X(embeddings):
    rows = embeddings.select("vec_id", "embedding").orderBy("vec_id").collect()
    return np.vstack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])


def test_covariance_matches_numpy(spark, embeddings):
    X = _X(embeddings)
    C = np.cov(X, rowvar=False, bias=True)  # population covariance
    got = {(r["i"], r["j"]): r["cov"] for r in emb_covariance(embeddings).collect()}
    d = X.shape[1]
    assert len(got) == d * (d + 1) // 2
    for (i, j), v in got.items():
        assert abs(v - C[i, j]) < 2e-6, (i, j, v, C[i, j])


def test_covariance_partitioning_invariance(spark, embeddings):
    base = {(r["i"], r["j"]): r["cov"] for r in emb_covariance(embeddings).collect()}
    re = {
        (r["i"], r["j"]): r["cov"]
        for r in emb_covariance(embeddings.repartition(13)).collect()
    }
    assert base == re  # rounded output is partitioning-independent


def test_pca_projections_have_eigen_variance_and_orthogonality(spark, embeddings):
    X = _X(embeddings)
    C = np.cov(X, rowvar=False, bias=True)
    vals = np.sort(np.linalg.eigvalsh(C))[::-1]

    rows = emb_pca(embeddings, k=2).orderBy("vec_id").collect()
    P = np.array([[r["pc0"], r["pc1"]] for r in rows])
    v0, v1 = P[:, 0].var(), P[:, 1].var()
    # projection variances are the top eigenvalues, in order
    assert abs(v0 - vals[0]) < 1e-3 * max(1.0, vals[0])
    assert abs(v1 - vals[1]) < 1e-3 * max(1.0, vals[1])
    assert v0 >= v1
    # projections onto distinct eigenvectors are uncorrelated
    corr = np.corrcoef(P[:, 0], P[:, 1])[0, 1]
    assert abs(corr) < 1e-2


def test_pca_components_are_unit_and_sign_fixed(spark, embeddings):
    mean, comps = pca_components(embeddings, k=2)
    for c in comps:
        assert abs(np.linalg.norm(c) - 1.0) < 1e-9
        assert c[np.argmax(np.abs(np.round(c, 9)))] > 0
    assert mean.shape == comps[0].shape


def test_empty_embeddings_degrade_gracefully(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>, label int")
    assert emb_covariance(empty).count() == 0
    out = emb_pca(empty, k=2)
    assert out.count() == 0 and set(out.columns) == {"vec_id", "pc0", "pc1"}


def test_pca_k_larger_than_dim_clamps(spark):
    rows = [(i, [float(i % 3), float(i % 5)], 0) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = emb_pca(df, k=10)
    assert set(out.columns) == {"vec_id", "pc0", "pc1"}  # d=2 caps the output
    assert out.count() == 20


def test_emb_standardize_matches_numpy(spark, embeddings):
    from baum_welch_spark.operators.linalg import emb_standardize

    X = _X(embeddings)
    mu, sd = X.mean(axis=0), X.std(axis=0)
    sd = np.where(sd > 0, sd, 1.0)
    Z = (X - mu) / sd
    got = emb_standardize(embeddings).orderBy("vec_id").collect()
    assert len(got) == X.shape[0]
    for r, z in zip(got, Z):
        assert abs(r.z_mean - z.mean()) < 2e-6
        assert abs(r.z_min - z.min()) < 2e-6
        assert abs(r.z_max - z.max()) < 2e-6
        assert abs(r.z_norm2 - (z * z).sum()) < 2e-5


def test_emb_standardize_constant_dim_uses_unit_sd(spark):
    from baum_welch_spark.operators.linalg import emb_standardize

    df = spark.createDataFrame(
        [(1, [5.0, 1.0]), (2, [5.0, 3.0])],
        schema="vec_id long, embedding array<float>",
    )
    rows = {r.vec_id: r for r in emb_standardize(df).collect()}
    # dim 0 constant: z = (5-5)/1 = 0; dim 1: z = ±1 (population sd = 1)
    assert rows[1].z_min == -1.0 and rows[1].z_max == 0.0
    assert rows[2].z_min == 0.0 and rows[2].z_max == 1.0
    assert rows[1].z_norm2 == 1.0 and rows[2].z_norm2 == 1.0


def test_linreg_multi_matches_numpy_lstsq(spark):
    # Cramer-solved normal equations == np.linalg.lstsq on the same data,
    # per group — pins the multivariate math independently of the DuckDB
    # oracle (which shares the formulas by construction).
    from baum_welch_spark.operators.linalg import linreg_multi

    li = load_table(spark, SF0001, "lineitem")
    got = {r.l_returnflag: r for r in linreg_multi(li).collect()}
    pdf = li.select(
        "l_returnflag", "l_quantity", "l_discount", "l_tax", "l_extendedprice"
    ).toPandas()
    for flag, g in pdf.groupby("l_returnflag"):
        X = np.column_stack(
            [g["l_quantity"], g["l_discount"], g["l_tax"], np.ones(len(g))]
        )
        beta, *_ = np.linalg.lstsq(X, g["l_extendedprice"].to_numpy(), rcond=None)
        r = got[flag]
        assert r.n == len(g)
        np.testing.assert_allclose(
            [r.b_qty, r.b_disc, r.b_tax, r.intercept], beta, rtol=1e-4, atol=1e-4
        )
        # r2 must be in [0, 1] and at least the bivariate fit's (adding
        # regressors never reduces in-sample R^2)
        assert 0.0 <= r.r2 <= 1.0


def test_pca_power_parity_matches_independent_numpy_replica(spark, embeddings):
    """The DuckDB-exact parity twin (pca_power_parity_sql) against a THIRD
    implementation: a numpy replica of the same spec — round(cov, 6),
    uniform 1/sqrt(d) init, matvec rounded to 9, norm2 rounded to 9,
    normalized v rounded to 9 per step. Engine-vs-engine equality is the
    driver's check; this pins the SQL against independent arithmetic."""
    from baum_welch_spark.operators.linalg import pca_power_parity

    X = _X(embeddings)
    d = X.shape[1]
    C = np.round(np.cov(X, rowvar=False, bias=True), 6)
    v = np.full(d, 1.0 / np.sqrt(d))
    for _ in range(3):
        u = np.round(C @ v, 9)
        n2 = round(float((u * u).sum()), 9)
        v = np.round(u / np.sqrt(n2), 9)
    lam = round(float(np.sqrt(n2)), 6)

    rows = pca_power_parity(spark, embeddings).collect()
    assert len(rows) == d
    got = {r["i"]: (r["loading"], r["eigenvalue"]) for r in rows}
    for i in range(d):
        # numpy's reassociated matvec sums vs the spec's: compare at the
        # readout rounding minus one guard digit
        assert abs(got[i][0] - round(float(v[i]), 6)) < 1e-5, (i, got[i], v[i])
        assert abs(got[i][1] - lam) < 1e-5


def test_pca_power_parity_eigenvalue_estimate_is_sane(spark, embeddings):
    """||C.v|| after 3 steps from uniform init must be positive and must
    not exceed the true top eigenvalue (power iteration approaches the
    spectral norm from below for symmetric PSD C)."""
    from baum_welch_spark.operators.linalg import pca_power_parity

    X = _X(embeddings)
    C = np.cov(X, rowvar=False, bias=True)
    lam_true = float(np.linalg.eigvalsh(C)[-1])
    lam_est = pca_power_parity(spark, embeddings).first()["eigenvalue"]
    assert 0.0 < lam_est <= lam_true + 1e-6, (lam_est, lam_true)
