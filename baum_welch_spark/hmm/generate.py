"""Sequence generation from a trained model: sample (states, observations)
paths from λ = (pi, A, B) — the Mahout ``HmmEvaluator`` capability the
reference ecosystem exposes for trained models (SURVEY §3.3: model-load for
downstream use, `BaumWelchUtils.java:56-125`), re-expressed as a distributed
generator. A user who trains a model to SIMULATE sequences (load testing,
synthetic corpora, model sanity checks) calls this.

Scale posture:

- The driver never materializes a sequence: a ``spark.range`` of sequence
  ids fans out across partitions and each task samples its own sequences
  inside an Arrow batch (`mapInPandas`), model broadcast.
- Determinism is PER SEQUENCE, not per partition: each seq_id seeds its own
  ``np.random.default_rng([seed, seq_id])`` stream, so output is identical
  under any partitioning / task retry — same contract as the portable-MD5
  samplers in `operators/sampling.py` (never ``rand()``).
- Sampling is inverse-CDF over the model rows (cumsum + searchsorted); the
  only Python-level loop is the T-step Markov chain per sequence, with the
  emission draws vectorized per sequence.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from baum_welch_spark.hmm.model import HMM

GENERATE_SCHEMA = "seq_id bigint, states array<int>, obs array<int>"


def _sample_one(
    rng: np.random.Generator,
    cum_pi: np.ndarray,
    cum_A: np.ndarray,
    cum_B: np.ndarray,
    t_len: int,
) -> tuple[np.ndarray, np.ndarray]:
    N = cum_pi.shape[0]
    u_s = rng.random(t_len)
    u_o = rng.random(t_len)
    states = np.empty(t_len, dtype=np.int64)
    s = min(int(np.searchsorted(cum_pi, u_s[0], side="right")), N - 1)
    states[0] = s
    for t in range(1, t_len):
        s = min(int(np.searchsorted(cum_A[s], u_s[t], side="right")), N - 1)
        states[t] = s
    # emissions: vectorized per sequence — row-pick the state's CDF, compare
    # against the uniform draw across all symbols at once
    obs = (cum_B[states] < u_o[:, None]).sum(axis=1)
    np.clip(obs, 0, cum_B.shape[1] - 1, out=obs)
    return states, obs


def generate_sequences(
    spark: SparkSession,
    model: HMM,
    n_sequences: int,
    t_len: int,
    seed: int = 0,
    num_partitions: int | None = None,
) -> DataFrame:
    """Sample ``n_sequences`` hidden-state/observation paths of length
    ``t_len`` from ``model``. Output: (seq_id, states, obs), deterministic
    given (seed, seq_id) under any partitioning.
    """
    if t_len <= 0:
        raise ValueError(f"generate_sequences: t_len must be positive, got {t_len}")
    model.validate()
    bc = spark.sparkContext.broadcast(
        (
            np.cumsum(model.pi),
            np.cumsum(model.A, axis=1),
            np.cumsum(model.B, axis=1),
        )
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cum_pi, cum_A, cum_B = bc.value
        for pdf in batches:
            ids, states_l, obs_l = [], [], []
            for seq_id in pdf["id"]:
                rng = np.random.default_rng([seed, int(seq_id)])
                states, obs = _sample_one(rng, cum_pi, cum_A, cum_B, t_len)
                ids.append(int(seq_id))
                states_l.append(states.tolist())
                obs_l.append(obs.tolist())
            yield pd.DataFrame({"seq_id": ids, "states": states_l, "obs": obs_l})

    ids = spark.range(0, n_sequences, 1, num_partitions or spark.sparkContext.defaultParallelism)
    return ids.mapInPandas(gen, schema=GENERATE_SCHEMA)


def generate_face(
    spark: SparkSession,
    model: HMM,
    n_sequences: int = 200,
    t_len: int = 20,
    seed: int = 7,
) -> DataFrame:
    """Driver-contract face: array columns emitted as comma-joined strings
    (the driver's canonicalizer can't hash arrays — same convention as
    viterbi_decode_face). Rows-only by nature: sampling from λ is not
    SQL-expressible; determinism and distributional correctness are pinned
    by tests/test_generate.py."""
    out = generate_sequences(spark, model, n_sequences, t_len, seed=seed)
    return out.select(
        "seq_id",
        F.array_join(F.transform("states", lambda x: x.cast("string")), ",").alias("states_str"),
        F.array_join(F.transform("obs", lambda x: x.cast("string")), ",").alias("obs_str"),
    ).orderBy("seq_id")
