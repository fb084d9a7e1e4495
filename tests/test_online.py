"""Online (stepwise) EM (hmm/online.py): convergence toward the batch-EM
fixed point on a stationary stream, and the streaming wiring."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from baum_welch_spark.hmm.fit import fit
from baum_welch_spark.hmm.model import HMM
from baum_welch_spark.hmm.online import OnlineEM, fit_stream
from baum_welch_spark.operators.sequences import build_sequences
from baum_welch_spark.sources.io import load_table

from conftest import SF0001


def _corpus_loglik(spark, seqs, model):
    from baum_welch_spark.hmm.decode import score_sequences

    return score_sequences(spark, seqs, model).agg(F.sum("loglik")).first()[0]


def test_online_em_improves_and_approaches_batch(spark):
    events = load_table(spark, SF0001, "events")
    seqs = build_sequences(events).cache()
    init = HMM.random(3, 5, seed=11)

    # batch reference: 3 full EM iterations
    batch_res = fit(spark, seqs, init, max_iter=3)

    # online: 3 epochs over the same corpus split into 3 hash micro-batches
    state = OnlineEM(model=init, alpha=0.7)
    parts = [seqs.filter(F.abs(F.hash("seq_id")) % 3 == i) for i in range(3)]
    for _epoch in range(3):
        for p in parts:
            state.update(spark, p)

    ll_init = _corpus_loglik(spark, seqs, init)
    ll_online = _corpus_loglik(spark, seqs, state.model)
    ll_batch = _corpus_loglik(spark, seqs, batch_res.model)
    assert ll_online > ll_init, (ll_online, ll_init)
    # online after 3 epochs must close most of the gap to batch EM
    assert ll_online > ll_init + 0.6 * (ll_batch - ll_init), (
        ll_init,
        ll_online,
        ll_batch,
    )
    # per-batch mean loglik trend: late batches better than early ones
    tr = state.loglik_trace
    assert np.mean(tr[-3:]) > np.mean(tr[:3])
    seqs.unpersist()


def test_online_em_empty_batch_is_noop(spark):
    init = HMM.random(2, 5, seed=3)
    state = OnlineEM(model=init, alpha=0.7)
    empty = spark.createDataFrame([], "seq_id bigint, obs array<int>")
    out = state.update(spark, empty)
    assert out is init and state.t == 0


def test_fit_stream_writes_models(spark, tmp_path):
    events = load_table(spark, SF0001, "events")
    seqs = build_sequences(events)
    src_dir = str(tmp_path / "stream_src")
    # two micro-batch files
    seqs.filter(F.col("seq_id") % 2 == 0).write.mode("append").parquet(src_dir)
    seqs.filter(F.col("seq_id") % 2 == 1).write.mode("append").parquet(src_dir)
    stream = (
        spark.readStream.schema("seq_id bigint, obs array<int>")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    out_dir = str(tmp_path / "models")
    q, state = fit_stream(
        stream,
        HMM.random(3, 5, seed=7),
        model_out=out_dir,
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(300)
    assert state.t >= 1
    loaded = HMM.read(spark, f"{out_dir}/model-0")
    loaded.validate()
    assert len(state.loglik_trace) == state.t


def test_online_fit_face_returns_valid_model(spark):
    """Face wrapper: the replayed-stream trainer must emit a tidy model
    frame that reconstructs into a valid (row-stochastic) HMM."""
    from baum_welch_spark.hmm.model import HMM
    from baum_welch_spark.hmm.online import online_fit_face
    from baum_welch_spark.sources.io import load_table

    from conftest import SF0001

    events = load_table(spark, SF0001, "events")
    df = online_fit_face(spark, events, n_hidden=3, n_batches=3, epochs=1)
    rows = [(r.kind, r.i, r.j, r.prob) for r in df.collect()]
    HMM.from_rows(rows)  # validates shapes + stochasticity
