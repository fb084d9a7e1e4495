"""Grouped (per-key) HMM training tests: each group's distributed result
must equal running the sequential kernel on that group's sequences alone."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from baum_welch_spark.hmm.grouped import fit_grouped, fit_per_event_class
from baum_welch_spark.hmm.kernel import sequential_baum_welch
from baum_welch_spark.hmm.model import HMM
from baum_welch_spark.operators.sequences import build_sequences, symbol_dictionary
from baum_welch_spark.sources.io import load_table

from conftest import SF0001


@pytest.fixture(scope="module")
def events(spark):
    return load_table(spark, SF0001, "events").cache()


def test_grouped_fit_matches_per_group_sequential(spark, events):
    n_obs = symbol_dictionary(events, "event_type").count()
    seqs = build_sequences(events).withColumn(
        "group", F.concat(F.lit("seg"), (F.col("seq_id") % 3).cast("string"))
    )
    got = fit_grouped(seqs, n_hidden=3, n_observed=n_obs, max_iter=4).collect()
    by_group: dict[str, dict] = {}
    for r in got:
        by_group.setdefault(r["group"], {"rows": {}, "ll": r["loglik"], "n": r["n_seqs"]})
        by_group[r["group"]]["rows"][(r["kind"], r["i"], r["j"])] = r["weight"]

    local = seqs.select("group", "seq_id", "obs").collect()
    for g in sorted({r["group"] for r in local}):
        obs = [
            np.asarray(r["obs"])
            for r in sorted(local, key=lambda r: r["seq_id"])
            if r["group"] == g
        ]
        model, trace = sequential_baum_welch(
            HMM.random(3, n_obs, seed=42), obs, max_iter=4
        )
        info = by_group[g]
        assert info["n"] == len(obs)
        assert abs(info["ll"] - trace[-1]) < 1e-8
        for i in range(3):
            assert abs(info["rows"][("pi", i, -1)] - model.pi[i]) < 1e-12
            for j in range(3):
                assert abs(info["rows"][("A", i, j)] - model.A[i, j]) < 1e-12
            for k in range(n_obs):
                assert abs(info["rows"][("B", i, k)] - model.B[i, k]) < 1e-12


def test_grouped_fit_partitioning_invariant(spark, events):
    out1 = fit_per_event_class(events, max_iter=2).collect()
    out2 = fit_per_event_class(events.repartition(11), max_iter=2).collect()
    assert [tuple(r) for r in out1] == [tuple(r) for r in out2]
    # every segment produced a full row-stochastic model
    groups = {r["group"] for r in out1}
    assert groups == {"seg0", "seg1", "seg2"}
    for g in groups:
        pi_sum = sum(r["weight"] for r in out1 if r["group"] == g and r["kind"] == "pi")
        assert abs(pi_sum - 1.0) < 1e-9
