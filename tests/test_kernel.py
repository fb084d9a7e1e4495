"""Kernel unit tests (SURVEY §5.1): scaled DP vs brute-force enumeration,
gamma/xi identities, M-step invariants, EM monotonicity. No Spark."""

import itertools

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from baum_welch_spark.hmm import HMM, forward_backward, e_step_counts, sequential_baum_welch
from baum_welch_spark.hmm.kernel import m_step


def brute_force_likelihood(pi, A, B, obs):
    """P(O|λ) by full path enumeration — only viable for tiny N, T."""
    N, T = pi.shape[0], len(obs)
    total = 0.0
    for path in itertools.product(range(N), repeat=T):
        p = pi[path[0]] * B[path[0], obs[0]]
        for t in range(1, T):
            p *= A[path[t - 1], path[t]] * B[path[t], obs[t]]
        total += p
    return total


def brute_force_gamma(pi, A, B, obs):
    """Posterior state marginals by enumeration."""
    N, T = pi.shape[0], len(obs)
    gamma = np.zeros((T, N))
    for path in itertools.product(range(N), repeat=T):
        p = pi[path[0]] * B[path[0], obs[0]]
        for t in range(1, T):
            p *= A[path[t - 1], path[t]] * B[path[t], obs[t]]
        for t, q in enumerate(path):
            gamma[t, q] += p
    return gamma / gamma.sum(axis=1, keepdims=True)


MODEL_TINY = HMM.from_distributions(
    pi=[0.6, 0.4],
    A=[[0.7, 0.3], [0.4, 0.6]],
    B=[[0.9, 0.1], [0.2, 0.8]],
)


def test_forward_likelihood_matches_enumeration():
    m = MODEL_TINY
    for obs in ([0, 1, 0], [1, 1, 1, 0], [0], [0, 0, 1, 1, 0]):
        _, _, scale, loglik = forward_backward(m.pi, m.A, m.B, np.array(obs))
        assert np.isclose(np.exp(loglik), brute_force_likelihood(m.pi, m.A, m.B, obs), rtol=1e-12)


def test_gamma_matches_enumeration():
    m = MODEL_TINY
    obs = np.array([0, 1, 1, 0])
    alpha, beta, scale, _ = forward_backward(m.pi, m.A, m.B, obs)
    gamma = alpha * beta
    assert np.allclose(gamma, brute_force_gamma(m.pi, m.A, m.B, obs), atol=1e-12)


def test_gamma_xi_identities():
    """Sum_q gamma_t(q) = 1; Sum_r xi_t(q,r) = gamma_t(q) (SURVEY §5.1)."""
    m = HMM.random(3, 4, seed=7)
    obs = np.random.default_rng(0).integers(0, 4, size=50)
    alpha, beta, scale, _ = forward_backward(m.pi, m.A, m.B, obs)
    gamma = alpha * beta
    assert np.allclose(gamma.sum(axis=1), 1.0, atol=1e-10)
    T = len(obs)
    for t in range(T - 1):
        xi_t = (
            alpha[t][:, None] * m.A * m.B[:, obs[t + 1]][None, :] * beta[t + 1][None, :]
            / scale[t + 1]
        )
        assert np.allclose(xi_t.sum(axis=1), gamma[t], atol=1e-10)
        assert np.isclose(xi_t.sum(), 1.0, atol=1e-10)


def test_e_step_counts_match_direct_sums():
    m = HMM.random(3, 5, seed=11)
    obs = np.random.default_rng(1).integers(0, 5, size=40)
    cpi = np.zeros(3); cA = np.zeros((3, 3)); cB = np.zeros((3, 5))
    e_step_counts(m.pi, m.A, m.B, obs, cpi, cA, cB)

    alpha, beta, scale, _ = forward_backward(m.pi, m.A, m.B, obs)
    gamma = alpha * beta
    assert np.allclose(cpi, gamma[0], atol=1e-12)
    expected_B = np.zeros((3, 5))
    for t, o in enumerate(obs):
        expected_B[:, o] += gamma[t]
    assert np.allclose(cB, expected_B, atol=1e-10)
    expected_A = np.zeros((3, 3))
    for t in range(len(obs) - 1):
        expected_A += (
            alpha[t][:, None] * m.A * m.B[:, obs[t + 1]][None, :] * beta[t + 1][None, :]
            / scale[t + 1]
        )
    assert np.allclose(cA, expected_A, atol=1e-10)


def test_long_sequence_no_underflow():
    """Rabiner scaling handles T far beyond the reference's unscaled ceiling
    (SURVEY §2.6 Q5: unscaled underflows at T of a few hundred)."""
    m = HMM.random(4, 8, seed=3)
    obs = np.random.default_rng(2).integers(0, 8, size=5000)
    alpha, beta, scale, loglik = forward_backward(m.pi, m.A, m.B, obs)
    assert np.isfinite(loglik)
    assert np.all(np.isfinite(alpha)) and np.all(np.isfinite(beta))
    gamma = alpha * beta
    assert np.allclose(gamma.sum(axis=1), 1.0, atol=1e-8)


def test_m_step_row_stochastic_and_zero_rows():
    cA = np.array([[1.0, 3.0], [0.0, 0.0]])
    m = m_step(np.array([2.0, 2.0]), cA, np.array([[5.0, 0.0], [1.0, 1.0]]))
    assert np.allclose(m.A[0], [0.25, 0.75])
    assert np.allclose(m.A[1], [0.5, 0.5])  # zero-mass row -> uniform
    m.validate()


def test_sequential_em_loglik_monotone():
    rng = np.random.default_rng(5)
    seqs = [rng.integers(0, 4, size=rng.integers(5, 60)) for _ in range(20)]
    init = HMM.random(3, 4, seed=9)
    model, trace = sequential_baum_welch(init, seqs, max_iter=15)
    model.validate()
    diffs = np.diff(trace)
    assert np.all(diffs > -1e-8), f"log-likelihood decreased: {trace}"


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(2, 5),
    m=st.integers(2, 6),
    seed=st.integers(0, 10_000),
)
def test_property_em_keeps_models_stochastic(n, m, seed):
    """Property (SURVEY §5.3): every iteration keeps pi/A/B row-stochastic."""
    rng = np.random.default_rng(seed)
    seqs = [rng.integers(0, m, size=rng.integers(1, 30)) for _ in range(8)]
    init = HMM.random(n, m, seed=seed)
    model, trace = sequential_baum_welch(init, seqs, max_iter=3)
    model.validate()
    assert np.all(np.diff(trace) > -1e-8)


def test_single_observation_sequence():
    """Edge: length-1 sequence (FIXTURES.md requires it)."""
    m = MODEL_TINY
    cpi = np.zeros(2); cA = np.zeros((2, 2)); cB = np.zeros((2, 2))
    ll = e_step_counts(m.pi, m.A, m.B, np.array([1]), cpi, cA, cB)
    assert np.isclose(cpi.sum(), 1.0)
    assert cA.sum() == 0.0  # no transitions in a length-1 sequence
    assert np.isclose(cB.sum(), 1.0)
    assert np.isclose(np.exp(ll), m.pi @ m.B[:, 1])


def test_batch_e_step_matches_per_sequence():
    """Batched (padded) kernel == per-sequence kernel to machine precision,
    including length-1 and max-length sequences in the same batch."""
    rng = np.random.default_rng(17)
    m = HMM.random(4, 6, seed=17)
    seqs = [rng.integers(0, 6, size=n) for n in [1, 3, 50, 50, 7, 29, 1, 64]]

    from baum_welch_spark.hmm.kernel import e_step_counts_batch

    p1 = np.zeros(4); A1 = np.zeros((4, 4)); B1 = np.zeros((4, 6))
    ll1 = sum(e_step_counts(m.pi, m.A, m.B, o, p1, A1, B1) for o in seqs)
    p2 = np.zeros(4); A2 = np.zeros((4, 4)); B2 = np.zeros((4, 6))
    ll2 = e_step_counts_batch(m.pi, m.A, m.B, seqs, p2, A2, B2)
    assert np.isclose(ll1, ll2, rtol=1e-12)
    np.testing.assert_allclose(p1, p2, atol=1e-12)
    np.testing.assert_allclose(A1, A2, atol=1e-12)
    np.testing.assert_allclose(B1, B2, atol=1e-12)


def test_batch_e_step_length_skew_bounded_and_exact():
    """VERDICT-r9 #5 (SURVEY §7 hard part #1): a pathological 10⁵-length
    outlier among 10³ short sequences must NOT inflate the whole batch's
    padded DP cost — octave bucketing bounds Σ_b(maxT_b · S_b) at 2·Σ T_s
    — and the bucketed counts must still match the per-sequence kernel."""
    from baum_welch_spark.hmm.kernel import _length_buckets, e_step_counts_batch

    rng = np.random.default_rng(23)
    short = [rng.integers(0, 5, size=int(rng.integers(4, 17))) for _ in range(1000)]
    outlier = rng.integers(0, 5, size=100_000)
    seqs = short + [outlier]
    lens = [len(o) for o in seqs]

    # cost bound: the structural fix, independent of wall-clock noise.
    # Unbucketed padding would cost max(T)·S ≈ 1e8 cells; bucketed stays
    # within 2x of the true Σ T_s ≈ 1.1e5.
    groups = _length_buckets(lens)
    padded = sum(max(lens[i] for i in g) * len(g) for g in groups)
    assert padded <= 2 * sum(lens)
    assert {i for g in groups for i in g} == set(range(len(seqs)))

    m = HMM.random(3, 5, seed=23)
    p1 = np.zeros(3); A1 = np.zeros((3, 3)); B1 = np.zeros((3, 5))
    ll1 = sum(e_step_counts(m.pi, m.A, m.B, o, p1, A1, B1) for o in seqs)
    p2 = np.zeros(3); A2 = np.zeros((3, 3)); B2 = np.zeros((3, 5))
    ll2 = e_step_counts_batch(m.pi, m.A, m.B, seqs, p2, A2, B2)
    assert np.isclose(ll1, ll2, rtol=1e-10)
    np.testing.assert_allclose(p1, p2, atol=1e-10)
    np.testing.assert_allclose(A1, A2, atol=1e-10)
    np.testing.assert_allclose(B1, B2, rtol=1e-9, atol=1e-10)


def test_batch_e_step_length_skew_weighted_matches():
    """The weights path follows the bucket permutation: weighted bucketed
    counts == weighted per-sequence counts with a skewed batch."""
    from baum_welch_spark.hmm.kernel import e_step_counts_batch

    rng = np.random.default_rng(29)
    seqs = [rng.integers(0, 4, size=n) for n in [2, 3, 500, 5, 70, 2, 1033, 9]]
    w = rng.uniform(0.5, 3.0, size=len(seqs))
    m = HMM.random(3, 4, seed=29)
    p1 = np.zeros(3); A1 = np.zeros((3, 3)); B1 = np.zeros((3, 4))
    ll1 = 0.0
    for o, wi in zip(seqs, w):
        pt = np.zeros(3); At = np.zeros((3, 3)); Bt = np.zeros((3, 4))
        ll1 += wi * e_step_counts(m.pi, m.A, m.B, o, pt, At, Bt)
        p1 += wi * pt; A1 += wi * At; B1 += wi * Bt
    p2 = np.zeros(3); A2 = np.zeros((3, 3)); B2 = np.zeros((3, 4))
    ll2 = e_step_counts_batch(m.pi, m.A, m.B, seqs, p2, A2, B2, weights=w)
    assert np.isclose(ll1, ll2, rtol=1e-10)
    np.testing.assert_allclose(p1, p2, atol=1e-10)
    np.testing.assert_allclose(A1, A2, rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(B1, B2, rtol=1e-9, atol=1e-10)
