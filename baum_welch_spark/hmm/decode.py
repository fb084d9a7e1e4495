"""Model-application operators: Viterbi decoding, posterior scoring, top-k.

The reference's downstream story (decoding/evaluation lives in Mahout's
sequential HmmEvaluator, outside the reference repo — SURVEY §3.3); here
they are first-class distributed operators over the ``sequences`` corpus:

  * viterbi_decode    — most likely hidden path per sequence (log-space DP)
  * score_sequences   — per-sequence log-likelihood under a model
  * top_k_sequences   — k most likely sequences under the model (window rank)

All are mapInPandas Arrow-batch operators: the model broadcasts, each batch
is decoded vectorized in NumPy, and output stays distributed. Scale: no
shuffle at all for decode/score (narrow map); top-k is one tiny global sort
of the scores projection.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from baum_welch_spark.hmm.model import HMM

DECODE_SCHEMA = "seq_id bigint, loglik double, path array<int>"
SCORE_SCHEMA = "seq_id bigint, t_len int, loglik double, avg_loglik double"


def _viterbi_one(log_pi, log_A, log_B, obs):
    """Log-space Viterbi for one sequence: returns (best path, best log-prob)."""
    T = obs.shape[0]
    N = log_pi.shape[0]
    delta = log_pi + log_B[:, obs[0]]
    psi = np.zeros((T, N), dtype=np.int32)
    for t in range(1, T):
        cand = delta[:, None] + log_A  # (N prev, N cur)
        psi[t] = np.argmax(cand, axis=0)
        delta = cand[psi[t], np.arange(N)] + log_B[:, obs[t]]
    path = np.empty(T, dtype=np.int32)
    path[T - 1] = int(np.argmax(delta))
    for t in range(T - 2, -1, -1):
        path[t] = psi[t + 1][path[t + 1]]
    return path, float(np.max(delta))


def viterbi_decode(spark: SparkSession, sequences: DataFrame, model: HMM) -> DataFrame:
    """sequences(seq_id, obs) -> (seq_id, loglik, path) under ``model``.

    loglik here is the joint log-probability of the best path (Viterbi
    score), not the marginal likelihood — use score_sequences for that.
    """
    with np.errstate(divide="ignore"):
        bc = spark.sparkContext.broadcast(
            (np.log(model.pi), np.log(model.A), np.log(model.B))
        )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        log_pi, log_A, log_B = bc.value
        for pdf in batches:
            ids, lls, paths = [], [], []
            for seq_id, obs in zip(pdf["seq_id"], pdf["obs"]):
                if obs is None or len(obs) == 0:
                    continue
                path, ll = _viterbi_one(log_pi, log_A, log_B, np.asarray(obs, dtype=np.int64))
                ids.append(seq_id)
                lls.append(ll)
                paths.append(path.tolist())
            yield pd.DataFrame({"seq_id": ids, "loglik": lls, "path": paths})

    return sequences.mapInPandas(decode, schema=DECODE_SCHEMA)


def viterbi_decode_face(spark: SparkSession, sequences: DataFrame, model: HMM) -> DataFrame:
    """Scalar driver-contract face of viterbi_decode: the ``path array<int>``
    column is not hashable by the driver's canonicalizer, so emit it as a
    comma-joined string (mirrors operators.markov.seq_build's ``obs_str``)
    and round the log-likelihood to a stable precision."""
    decoded = viterbi_decode(spark, sequences, model)
    return decoded.select(
        "seq_id",
        F.round("loglik", 6).alias("loglik"),
        F.array_join(F.transform("path", lambda x: x.cast("string")), ",").alias("path_str"),
    )


def score_sequences(spark: SparkSession, sequences: DataFrame, model: HMM) -> DataFrame:
    """Per-sequence marginal log-likelihood log P(O|λ) via the scaled forward
    pass (sum of log scale factors — kernel.forward_backward convention)."""
    bc = spark.sparkContext.broadcast((model.pi, model.A, model.B))

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from baum_welch_spark.hmm.kernel import forward_backward

        pi, A, B = bc.value
        for pdf in batches:
            ids, lens, lls = [], [], []
            for seq_id, obs in zip(pdf["seq_id"], pdf["obs"]):
                if obs is None or len(obs) == 0:
                    continue
                o = np.asarray(obs, dtype=np.int64)
                _, _, _, ll = forward_backward(pi, A, B, o)
                ids.append(seq_id)
                lens.append(len(o))
                lls.append(ll)
            yield pd.DataFrame(
                {
                    "seq_id": ids,
                    "t_len": np.array(lens, dtype=np.int32),
                    "loglik": lls,
                    "avg_loglik": np.array(lls) / np.array(lens),
                }
            )

    return sequences.mapInPandas(score, schema=SCORE_SCHEMA)


def top_k_sequences(spark: SparkSession, sequences: DataFrame, model: HMM, k: int = 10) -> DataFrame:
    """k sequences with the highest per-step likelihood under the model
    (deterministic tiebreak by seq_id). The first window/rank usage of the
    HMM surface (SURVEY §7 phase 4)."""
    scored = score_sequences(spark, sequences, model)
    return (
        scored.orderBy(F.desc("avg_loglik"), F.asc("seq_id")).limit(k)
    )
