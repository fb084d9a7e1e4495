"""FFBS posterior path sampling (hmm/sample.py): statistical and structural
checks against the exact forward-backward posterior."""

import numpy as np
from pyspark.sql import functions as F

from baum_welch_spark.hmm import HMM
from baum_welch_spark.hmm.kernel import forward_backward
from baum_welch_spark.hmm.sample import posterior_sample
from baum_welch_spark.operators.sequences import build_sequences
from baum_welch_spark.sources.io import load_table

from conftest import SF0001

N, M = 3, 5


def _seqs(spark, limit=20):
    events = load_table(spark, SF0001, "events")
    return build_sequences(events).orderBy("seq_id").limit(limit)


def test_ffbs_marginals_match_gamma(spark):
    """Empirical per-step state frequencies over many draws must converge
    to the exact posterior marginals gamma_t = alpha_t * beta_t."""
    model = HMM.random(N, M, seed=3)
    seqs = _seqs(spark, limit=8).cache()
    n_samples = 600
    rows = posterior_sample(spark, seqs, model, n_samples=n_samples, seed=7).collect()
    by_seq = {}
    for r in rows:
        by_seq.setdefault(r.seq_id, []).append([int(s) for s in r.path_str.split(",")])
    obs_by_seq = {r.seq_id: np.asarray(r.obs, dtype=np.int64) for r in seqs.collect()}
    assert set(by_seq) == set(obs_by_seq)
    worst = 0.0
    for sid, paths in by_seq.items():
        P = np.array(paths)  # (n_samples, T)
        assert P.shape == (n_samples, len(obs_by_seq[sid]))
        alpha, beta, _, _ = forward_backward(model.pi, model.A, model.B, obs_by_seq[sid])
        gamma = alpha * beta
        gamma /= gamma.sum(axis=1, keepdims=True)
        for t in range(P.shape[1]):
            emp = np.bincount(P[:, t], minlength=N) / n_samples
            worst = max(worst, float(np.abs(emp - gamma[t]).max()))
    # binomial std at p=0.5, n=600 is ~0.02; 0.08 is a ~4-sigma band
    assert worst < 0.08, worst
    seqs.unpersist()


def test_ffbs_transition_structure(spark):
    """Sampled paths must respect structural zeros: under a Bakis model a
    draw can never use a masked transition."""
    mask = HMM.bakis_mask(N, bandwidth=1)
    model = HMM.random_masked(N, M, mask, seed=5)
    seqs = _seqs(spark, limit=10)
    rows = posterior_sample(spark, seqs, model, n_samples=20, seed=11).collect()
    assert rows
    for r in rows:
        path = [int(s) for s in r.path_str.split(",")]
        assert path[0] == 0  # pi = e_0
        for a, b in zip(path, path[1:]):
            assert mask[a, b], (a, b)


def test_ffbs_deterministic_and_partition_invariant(spark):
    """Same (seed, seq_id) -> same draws, independent of partitioning."""
    model = HMM.random(N, M, seed=3)
    seqs = _seqs(spark, limit=10)
    a = sorted(
        (r.seq_id, r.sample_id, r.path_str)
        for r in posterior_sample(spark, seqs, model, n_samples=3, seed=9).collect()
    )
    b = sorted(
        (r.seq_id, r.sample_id, r.path_str)
        for r in posterior_sample(
            spark, seqs.repartition(7), model, n_samples=3, seed=9
        ).collect()
    )
    assert a == b and len(a) == 30
