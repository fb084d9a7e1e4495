"""Phase-3 parity hardening (SURVEY §7): the cases that break the reference
by construction — N >= 10 states (single-char stripe keys, §2.6 Q4), long
sequences (unscaled underflow, Q5), multi-sequence posterior weighting (Q3)
— all through the DISTRIBUTED path."""

import numpy as np
import pytest

from baum_welch_spark.hmm import HMM, sequential_baum_welch
from baum_welch_spark.hmm.fit import fit


def _df(spark, seqs):
    return spark.createDataFrame(
        [(i, [int(x) for x in o]) for i, o in enumerate(seqs)],
        schema="seq_id bigint, obs array<int>",
    )


def test_fit_with_twelve_hidden_states(spark):
    """N=12 > 9: impossible in the reference's stripe-key encoding
    (charAt(5)/charAt(8), BaumWelchUtils.java:100-111)."""
    rng = np.random.default_rng(4)
    seqs = [rng.integers(0, 6, size=rng.integers(10, 40)) for _ in range(30)]
    init = HMM.random(12, 6, seed=4)
    expected, _ = sequential_baum_welch(init, seqs, max_iter=3)
    result = fit(spark, _df(spark, seqs), init, max_iter=3)
    np.testing.assert_allclose(result.model.A, expected.A, atol=1e-8)
    np.testing.assert_allclose(result.model.B, expected.B, atol=1e-8)


def test_fit_long_sequences_no_underflow(spark):
    """T = 2000 >> the unscaled DP's underflow ceiling (§2.6 Q5)."""
    rng = np.random.default_rng(8)
    seqs = [rng.integers(0, 4, size=2000) for _ in range(6)]
    init = HMM.random(3, 4, seed=8)
    result = fit(spark, _df(spark, seqs), init, max_iter=2)
    assert np.all(np.isfinite(result.loglik_trace))
    result.model.validate()
    expected, trace = sequential_baum_welch(init, seqs, max_iter=2)
    np.testing.assert_allclose(result.model.A, expected.A, atol=1e-8)
    np.testing.assert_allclose(result.loglik_trace, trace, rtol=1e-10)


def test_multi_sequence_posterior_weighting(spark):
    """Q3: each sequence contributes posterior-normalized counts. A corpus of
    one long + one short sequence must give the same model as the sequential
    oracle (which normalizes per sequence); the reference would weight the
    long/likely sequence by its raw likelihood instead."""
    rng = np.random.default_rng(11)
    seqs = [rng.integers(0, 3, size=200), rng.integers(0, 3, size=3)]
    init = HMM.random(2, 3, seed=11)
    expected, _ = sequential_baum_welch(init, seqs, max_iter=4)
    result = fit(spark, _df(spark, seqs), init, max_iter=4)
    np.testing.assert_allclose(result.model.A, expected.A, atol=1e-8)
    np.testing.assert_allclose(result.model.B, expected.B, atol=1e-8)
    # and the per-sequence gamma sums to 1 per step regardless of likelihood:
    from baum_welch_spark.hmm.kernel import forward_backward

    for o in seqs:
        alpha, beta, _, _ = forward_backward(init.pi, init.A, init.B, o)
        assert np.allclose((alpha * beta).sum(axis=1), 1.0, atol=1e-9)


def test_empty_and_null_sequences_skipped(spark):
    df = spark.createDataFrame(
        [(0, [0, 1, 2]), (1, []), (2, None), (3, [2])],
        schema="seq_id bigint, obs array<int>",
    )
    init = HMM.random(2, 3, seed=1)
    expected, _ = sequential_baum_welch(init, [np.array([0, 1, 2]), np.array([2])], max_iter=2)
    result = fit(spark, df, init, max_iter=2)
    np.testing.assert_allclose(result.model.A, expected.A, atol=1e-8)
    np.testing.assert_allclose(result.model.B, expected.B, atol=1e-8)


def test_round6_faces_handle_empty_inputs(spark):
    # every new face must return an EMPTY frame (not raise) on empty input
    from baum_welch_spark.operators.linalg import linreg_multi
    from baum_welch_spark.operators.relational import (
        q7_volume_shipping,
        q13_customer_distribution,
        q18_large_volume_customers,
        q22_dormant_customers,
        time_bucket_interpolate,
    )
    from baum_welch_spark.operators.text import copy_pairs, winnow_fingerprints

    li = spark.createDataFrame(
        [],
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, l_tax double, "
        "l_returnflag string, l_linestatus string, l_shipdate timestamp",
    )
    orders = spark.createDataFrame(
        [],
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    customer = spark.createDataFrame(
        [], "c_custkey bigint, c_name string, c_nationkey bigint, c_acctbal double, c_mktsegment string"
    )
    supplier = spark.createDataFrame(
        [], "s_suppkey bigint, s_name string, s_nationkey bigint, s_acctbal double"
    )
    nation = spark.createDataFrame([], "n_nationkey bigint, n_name string, n_regionkey bigint")
    docs = spark.createDataFrame([], "doc_id bigint, text string")
    events = spark.createDataFrame(
        [], "event_id bigint, user_id bigint, event_type string, ts timestamp, value double"
    )

    assert linreg_multi(li).count() == 0
    assert q7_volume_shipping(li, orders, customer, supplier, nation).count() == 0
    assert q13_customer_distribution(customer, orders).count() == 0
    assert q18_large_volume_customers(customer, orders, li).count() == 0
    assert q22_dormant_customers(customer, orders).count() == 0
    assert time_bucket_interpolate(events).count() == 0
    assert winnow_fingerprints(docs).count() == 0
    assert copy_pairs(docs).count() == 0
