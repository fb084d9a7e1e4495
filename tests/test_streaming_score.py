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


class _FakeState:
    """Minimal GroupState stand-in for unit-testing the update function's
    state contract (exists/get/update) across micro-batches."""

    def __init__(self):
        self._v = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)


def test_scorer_survives_oov_only_first_batch(spark):
    """A first micro-batch of only unknown symbols persists alpha=None; the
    next batch must restore that as 'no forward state yet' instead of
    crashing on np.asarray(None) (ADVICE r1)."""
    import pandas as pd

    from baum_welch_spark.streaming.score import hmm_stream_scorer

    update = hmm_stream_scorer(MODEL, {"click": 0, "view": 1})
    state = _FakeState()
    batch1 = pd.DataFrame(
        {"user_id": [7, 7], "event_id": [1, 2], "ts": [1, 2], "event_type": ["zzz", "unknown"]}
    )
    out1 = list(update((7,), iter([batch1]), state))
    assert out1[0]["t_len"].iloc[0] == 0 and state.get[0] is None
    batch2 = pd.DataFrame(
        {"user_id": [7, 7], "event_id": [3, 4], "ts": [3, 4], "event_type": ["click", "view"]}
    )
    out2 = list(update((7,), iter([batch2]), state))
    assert out2[0]["t_len"].iloc[0] == 2
    # matches the batch forward pass over just the two known symbols
    from baum_welch_spark.hmm.kernel import forward_backward

    _, _, _, ll = forward_backward(MODEL.pi, MODEL.A, MODEL.B, np.array([0, 1]))
    assert np.isclose(out2[0]["loglik"].iloc[0], ll, atol=1e-12)


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
