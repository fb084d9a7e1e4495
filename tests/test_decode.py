"""Viterbi decode + scoring tests: distributed ops vs NumPy brute force."""

import itertools

import numpy as np
import pytest

from baum_welch_spark.hmm import HMM
from baum_welch_spark.hmm.decode import score_sequences, top_k_sequences, viterbi_decode
from baum_welch_spark.operators.sequences import build_sequences
from baum_welch_spark.sources.io import load_table

from conftest import SF0001

MODEL = HMM.random(3, 5, seed=21)


@pytest.fixture(scope="module")
def sequences_df(spark):
    return build_sequences(load_table(spark, SF0001, "events")).cache()


def brute_best_path(m: HMM, obs):
    best, best_p = None, -1.0
    for path in itertools.product(range(m.n_hidden), repeat=len(obs)):
        p = m.pi[path[0]] * m.B[path[0], obs[0]]
        for t in range(1, len(obs)):
            p *= m.A[path[t - 1], path[t]] * m.B[path[t], obs[t]]
        if p > best_p:
            best, best_p = path, p
    return list(best), np.log(best_p)


def test_viterbi_matches_enumeration(spark):
    seqs = [(0, [0, 1, 2]), (1, [4, 4, 0, 1]), (2, [3])]
    df = spark.createDataFrame(seqs, schema="seq_id bigint, obs array<int>")
    got = {r.seq_id: (list(r.path), r.loglik) for r in viterbi_decode(spark, df, MODEL).collect()}
    for seq_id, obs in seqs:
        path, ll = brute_best_path(MODEL, obs)
        assert got[seq_id][0] == path, f"seq {seq_id}"
        assert np.isclose(got[seq_id][1], ll, atol=1e-10)


def test_score_matches_kernel(spark, sequences_df):
    from baum_welch_spark.hmm.kernel import forward_backward

    got = {r.seq_id: r for r in score_sequences(spark, sequences_df, MODEL).collect()}
    for row in sequences_df.collect():
        _, _, _, ll = forward_backward(MODEL.pi, MODEL.A, MODEL.B, np.array(row.obs))
        assert np.isclose(got[row.seq_id].loglik, ll, atol=1e-10)
        assert np.isclose(got[row.seq_id].avg_loglik, ll / len(row.obs), atol=1e-10)


def test_top_k(spark, sequences_df):
    top = top_k_sequences(spark, sequences_df, MODEL, k=5).collect()
    assert len(top) == 5
    scores = [r.avg_loglik for r in top]
    assert scores == sorted(scores, reverse=True)
    all_scores = sorted(
        (r.avg_loglik for r in score_sequences(spark, sequences_df, MODEL).collect()), reverse=True
    )
    assert np.allclose(scores, all_scores[:5], atol=1e-12)


def test_decode_path_states_in_range(spark, sequences_df):
    paths = viterbi_decode(spark, sequences_df, MODEL).collect()
    assert len(paths) == sequences_df.count()
    for r in paths:
        assert len(r.path) > 0
        assert all(0 <= q < MODEL.n_hidden for q in r.path)
