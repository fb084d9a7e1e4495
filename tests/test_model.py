"""HMM model container tests: validate, codecs, distance. No Spark."""

import numpy as np
import pytest

from baum_welch_spark.hmm import HMM


def test_random_is_valid_and_seeded():
    a = HMM.random(4, 8, seed=42)
    b = HMM.random(4, 8, seed=42)
    assert np.array_equal(a.A, b.A) and np.array_equal(a.B, b.B)
    a.validate()


def test_validate_rejects_bad_rows():
    m = HMM.random(3, 3, seed=0)
    m.A[0, 0] += 0.5
    with pytest.raises(ValueError):
        m.validate()


def test_validate_rejects_negative():
    m = HMM.random(2, 2, seed=0)
    m.pi = np.array([1.5, -0.5])
    with pytest.raises(ValueError):
        m.validate()


def test_row_roundtrip_large_state_count():
    """N >= 10 must work — the reference's single-char stripe keys break there
    (SURVEY §2.6 Q4, BaumWelchUtils.java:100-111)."""
    m = HMM.random(12, 15, seed=1)
    rt = HMM.from_rows(m.to_rows())
    assert np.allclose(rt.pi, m.pi) and np.allclose(rt.A, m.A) and np.allclose(rt.B, m.B)


def test_json_roundtrip():
    m = HMM.random(3, 4, seed=2)
    rt = HMM.from_json(m.to_json())
    assert np.allclose(rt.A, m.A) and np.allclose(rt.B, m.B) and np.allclose(rt.pi, m.pi)


def test_distance_frobenius():
    a = HMM.uniform(2, 2)
    b = HMM.from_distributions([0.5, 0.5], [[1.0, 0.0], [0.0, 1.0]], [[0.5, 0.5], [0.5, 0.5]])
    # ||A_a - A_b||_F = sqrt(4 * 0.25) = 1, B identical -> 0
    assert np.isclose(a.distance(b), 1.0)
    assert a.distance(a) == 0.0
