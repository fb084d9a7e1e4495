"""Stateful streaming HMM scorer vs the batch forward pass."""

import numpy as np
import pytest

from baum_welch_spark.hmm import HMM
from baum_welch_spark.hmm.decode import score_sequences
from baum_welch_spark.operators.sequences import build_sequences, symbol_dict
from baum_welch_spark.sources.io import load_table
from baum_welch_spark.streaming.score import score_stream
from baum_welch_spark.streaming.sessionize import run_to_memory, stream_events

from conftest import SF0001

MODEL = HMM.random(3, 5, seed=33)


def test_streaming_score_matches_batch(spark):
    events = load_table(spark, SF0001, "events")
    mapping = symbol_dict(events)

    stream = score_stream(stream_events(spark, SF0001), MODEL, mapping)
    run_to_memory(stream, "hmm_scores", output_mode="update")
    got = {r.user_id: (r.t_len, r.loglik) for r in spark.sql("SELECT * FROM hmm_scores").collect()}

    batch = score_sequences(spark, build_sequences(events), MODEL)
    expect = {r.seq_id: (r.t_len, r.loglik) for r in batch.collect()}

    assert set(got) == set(expect)
    for uid, (t_len, ll) in expect.items():
        assert got[uid][0] == t_len
        assert np.isclose(got[uid][1], ll, atol=1e-9), uid
