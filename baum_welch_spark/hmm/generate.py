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
- The random source is COUNTER-BASED, not a sequential stream: every draw
  is ``portable_hash60(seed:seq_id:tag:t) / 2^60`` — a pure function of its
  coordinates, like Philox/Threefry counter RNGs, which is the right shape
  for distributed generation (no stream to carve up, identical under any
  partitioning / task retry / engine). The hashes are computed JVM-side in
  whole-stage codegen (arrays of T uniforms per sequence); the Python
  kernel only runs the T-step Markov chain over them.
- Because the hash is the same portable MD5 convention as
  `operators/sampling.py`, the ENTIRE generator is reproducible in ANSI
  SQL: :func:`generate_oracle_sql` rebuilds the identical chains in DuckDB
  (unrolled t, literal inverse-CDF thresholds), so even this sampler has a
  DuckDB-exact oracle. Every arithmetic step is bit-stable cross-engine:
  uniform = correctly-rounded int->double then exact power-of-two scaling;
  thresholds are the same float64 cumsums embedded as literals; inverse-CDF
  is pure `<`/`<=` comparisons.
- Sampling is inverse-CDF over the model rows (cumsum + searchsorted); the
  only Python-level loop is the T-step Markov chain per sequence, with the
  emission draws vectorized per sequence.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from baum_welch_spark.hmm.model import HMM

GENERATE_SCHEMA = "seq_id bigint, states array<int>, obs array<int>"

#: 2^60: the portable hash is 60 bits, so u = h / 2^60 is in [0, 1]
_HASH_SCALE = float(1 << 60)


def _uniforms(seed: int, tag: str, t_len: int) -> Column:
    """array<double> of ``t_len`` counter-based uniforms for the current
    ``id`` row: portable_hash60("seed:id:tag:t") / 2^60, all JVM codegen."""
    from baum_welch_spark.functions.columns import portable_hash60

    return F.transform(
        F.sequence(F.lit(0), F.lit(t_len - 1)),
        lambda t: portable_hash60(
            F.concat_ws(
                ":",
                F.lit(str(seed)),
                F.col("id").cast("string"),
                F.lit(tag),
                t.cast("string"),
            )
        ).cast("double")
        / F.lit(_HASH_SCALE),
    )


def _sample_one(
    u_s: np.ndarray,
    u_o: np.ndarray,
    cum_pi: np.ndarray,
    cum_A: np.ndarray,
    cum_B: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    N = cum_pi.shape[0]
    t_len = u_s.shape[0]
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
    given (seed, seq_id) under any partitioning — and reproducible in any
    engine (see :func:`generate_oracle_sql`).
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
            for seq_id, u_s, u_o in zip(pdf["id"], pdf["us"], pdf["uo"]):
                states, obs = _sample_one(
                    np.asarray(u_s, dtype=np.float64),
                    np.asarray(u_o, dtype=np.float64),
                    cum_pi,
                    cum_A,
                    cum_B,
                )
                ids.append(int(seq_id))
                states_l.append(states.tolist())
                obs_l.append(obs.tolist())
            yield pd.DataFrame({"seq_id": ids, "states": states_l, "obs": obs_l})

    ids = spark.range(
        0, n_sequences, 1, num_partitions or spark.sparkContext.defaultParallelism
    ).select(
        "id",
        _uniforms(seed, "s", t_len).alias("us"),
        _uniforms(seed, "o", t_len).alias("uo"),
    )
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
    viterbi_decode_face). DuckDB-exact: :func:`generate_oracle_sql` replays
    the identical counter-RNG chains in SQL."""
    out = generate_sequences(spark, model, n_sequences, t_len, seed=seed)
    return out.select(
        "seq_id",
        F.array_join(F.transform("states", lambda x: x.cast("string")), ",").alias("states_str"),
        F.array_join(F.transform("obs", lambda x: x.cast("string")), ",").alias("obs_str"),
    ).orderBy("seq_id")


def generate_oracle_sql(
    model: HMM, n_sequences: int = 200, t_len: int = 20, seed: int = 7
) -> str:
    """ANSI-SQL (DuckDB) replay of :func:`generate_face`: the t axis is
    unrolled into chained CTEs (one per step), each draw recomputes the
    same MD5 counter uniform, and the inverse-CDF is a literal CASE over
    the same float64 cumsum thresholds the Spark kernel broadcasts.

    Cross-engine exactness argument: u = (60-bit int -> double, correctly
    rounded) / 2^60 (exact) is bit-identical; thresholds are the same
    doubles by construction (both sides are np.cumsum of the same model,
    embedded here via repr); comparisons are exact predicates on identical
    doubles. searchsorted(side='right') == first threshold strictly above
    u; the emission's strict-less count == first threshold at-or-above u.
    """
    cum_pi = np.cumsum(model.pi)
    cum_A = np.cumsum(model.A, axis=1)
    cum_B = np.cumsum(model.B, axis=1)
    N, M = model.n_hidden, model.n_observed

    def u(tag: str, t: int) -> str:
        return (
            f"(('0x' || substr(md5('{seed}:' || seq_id || ':{tag}:{t}'), 1, 15))"
            f"::BIGINT / {_HASH_SCALE!r})"
        )

    def pick_state(u_expr: str, cum: np.ndarray) -> str:
        branches = " ".join(
            f"WHEN {u_expr} < {float(cum[i])!r} THEN {i}" for i in range(N - 1)
        )
        return f"CASE {branches} ELSE {N - 1} END"

    def pick_obs(u_expr: str, cum: np.ndarray) -> str:
        branches = " ".join(
            f"WHEN {u_expr} <= {float(cum[j])!r} THEN {j}" for j in range(M - 1)
        )
        return f"CASE {branches} ELSE {M - 1} END"

    ctes = [f"ids AS (SELECT range::BIGINT AS seq_id FROM range(0, {n_sequences}))"]
    ctes.append(
        f"c0 AS (SELECT seq_id, ({pick_state(u('s', 0), cum_pi)}) AS s0 FROM ids)"
    )
    for t in range(1, t_len):
        trans = " ".join(
            f"WHEN s{t - 1} = {i} THEN ({pick_state(u('s', t), cum_A[i])})"
            for i in range(N)
        )
        ctes.append(
            f"c{t} AS (SELECT *, (CASE {trans} END) AS s{t} FROM c{t - 1})"
        )
    obs_exprs = []
    for t in range(t_len):
        emit = " ".join(
            f"WHEN s{t} = {i} THEN ({pick_obs(u('o', t), cum_B[i])})" for i in range(N)
        )
        obs_exprs.append(f"(CASE {emit} END) AS o{t}")
    states_str = ", ".join(f"s{t}" for t in range(t_len))
    obs_str = ", ".join(f"o{t}" for t in range(t_len))
    cte_block = ",\n".join(ctes)
    return f"""
WITH {cte_block},
emitted AS (
  SELECT seq_id, {states_str}, {", ".join(obs_exprs)} FROM c{t_len - 1}
)
SELECT seq_id,
       concat_ws(',', {states_str}) AS states_str,
       concat_ws(',', {obs_str}) AS obs_str
FROM emitted ORDER BY seq_id
"""
