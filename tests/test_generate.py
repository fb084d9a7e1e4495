"""Sequence-generation tests: partitioning-invariant determinism and
distributional correctness (empirical pi/A/B converge to the model)."""

import numpy as np
import pytest

from baum_welch_spark.hmm import HMM
from baum_welch_spark.hmm.generate import generate_face, generate_sequences

#: a model with well-separated rows so empirical estimates are diagnostic
MODEL = HMM(
    pi=np.array([0.7, 0.2, 0.1]),
    A=np.array([[0.8, 0.15, 0.05], [0.1, 0.7, 0.2], [0.25, 0.25, 0.5]]),
    B=np.array([[0.6, 0.3, 0.05, 0.05], [0.05, 0.6, 0.3, 0.05], [0.1, 0.1, 0.1, 0.7]]),
)


def test_deterministic_under_partitioning(spark):
    a = sorted(
        (r.seq_id, tuple(r.states), tuple(r.obs))
        for r in generate_sequences(spark, MODEL, 100, 15, seed=5, num_partitions=2).collect()
    )
    b = sorted(
        (r.seq_id, tuple(r.states), tuple(r.obs))
        for r in generate_sequences(spark, MODEL, 100, 15, seed=5, num_partitions=7).collect()
    )
    assert a == b
    assert len(a) == 100 and all(len(s) == 15 for _, s, _ in a)


def test_seed_changes_output(spark):
    a = {r.seq_id: tuple(r.obs) for r in generate_sequences(spark, MODEL, 50, 10, seed=1).collect()}
    b = {r.seq_id: tuple(r.obs) for r in generate_sequences(spark, MODEL, 50, 10, seed=2).collect()}
    assert any(a[k] != b[k] for k in a)


def test_empirical_distributions_converge_to_model(spark):
    rows = generate_sequences(spark, MODEL, 3000, 30, seed=11).collect()
    states = np.array([r.states for r in rows])  # (n, T)
    obs = np.array([r.obs for r in rows])
    N, M = MODEL.n_hidden, MODEL.n_observed

    # initial distribution
    emp_pi = np.bincount(states[:, 0], minlength=N) / len(rows)
    assert np.abs(emp_pi - MODEL.pi).max() < 0.03, emp_pi

    # transition matrix: counts over all (t, t+1) pairs
    emp_A = np.zeros((N, N))
    np.add.at(emp_A, (states[:, :-1].ravel(), states[:, 1:].ravel()), 1.0)
    emp_A /= emp_A.sum(axis=1, keepdims=True)
    assert np.abs(emp_A - MODEL.A).max() < 0.03, emp_A

    # emission matrix conditioned on the generated states
    emp_B = np.zeros((N, M))
    np.add.at(emp_B, (states.ravel(), obs.ravel()), 1.0)
    emp_B /= emp_B.sum(axis=1, keepdims=True)
    assert np.abs(emp_B - MODEL.B).max() < 0.03, emp_B


def test_face_schema_and_ranges(spark):
    out = generate_face(spark, HMM.random(4, 5, seed=42), n_sequences=20, t_len=8).collect()
    assert len(out) == 20
    assert set(out[0].asDict()) == {"seq_id", "states_str", "obs_str"}
    for r in out:
        states = [int(x) for x in r.states_str.split(",")]
        obs = [int(x) for x in r.obs_str.split(",")]
        assert len(states) == 8 and len(obs) == 8
        assert all(0 <= s < 4 for s in states) and all(0 <= o < 5 for o in obs)


def test_bad_t_len_raises(spark):
    with pytest.raises(ValueError, match="t_len"):
        generate_sequences(spark, MODEL, 5, 0)
