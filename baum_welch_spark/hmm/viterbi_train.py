"""Viterbi training (hard EM / segmental k-means) on Spark DataFrames.

The soft Baum-Welch E-step (hmm/fit.py) accumulates EXPECTED counts from the
forward-backward posteriors; Viterbi training replaces that with the single
best state path per sequence (Rabiner 1989 §IV-B "segmental k-means") and
re-estimates from the resulting HARD counts:

    pi_i  = #(sequences whose Viterbi path starts in i)   / #sequences
    A_ij  = #(path transitions i -> j)                    / #(i in path[:-1])
    B_ik  = #(path visits i while emitting symbol k)      / #(i in path)

Same dataflow shape as the soft fit (reference driver D2,
BaumWelchDriver.java:114-134, re-expressed Spark-first): broadcast model ->
one mapInPandas pass accumulating per-batch count stripes -> groupBy sum of
the tiny (kind, i, j) blocks -> driver-side NumPy normalize. Shuffle volume
per iteration is O(partitions * N * (N + M)), corpus-size-free; the Viterbi
joint log-likelihood (sum of best-path scores) is the convergence metric.

It converges in far fewer, far cheaper iterations than soft EM (each pass is
a single max-product DP, no backward sweep / xi accumulation) at the cost of
a coarser optimum — the standard large-corpus trade, which is exactly when
the distributed setting matters.

The single re-estimation step is DuckDB-exact (viterbi_reestimate_oracle_sql
reuses decode.viterbi_ctes, whose DP cells are BITWISE equal to the Spark
kernel's, so the hard counts are integer-identical and count/count division
matches without rounding). The multi-iteration loop is pytest-pinned against
a sequential NumPy oracle to 1e-12.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from baum_welch_spark.hmm.decode import _viterbi_one, viterbi_ctes
from baum_welch_spark.hmm.fit import (
    COUNTS_SCHEMA,
    KIND_LOGLIK,
    FitResult,
    normalize_counts,
)
from baum_welch_spark.hmm.kernel import m_step
from baum_welch_spark.hmm.model import (
    HMM,
    KIND_EMISSION,
    KIND_INITIAL,
    KIND_TRANSITION,
)


def hard_count_udf(bc_log_model):
    """mapInPandas function for one hard-EM pass: Viterbi-decode every
    sequence in the Arrow batch, accumulate path counts into local NumPy
    arrays, and emit ONE flattened (kind, i, j, weight) block per batch plus
    the Viterbi joint log-likelihood side-channel row (the in-UDF map-side
    combine, same shape as fit.e_step_udf)."""

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        log_pi, log_A, log_B = bc_log_model.value
        n, m = log_A.shape[0], log_B.shape[1]
        cpi = np.zeros(n)
        cA = np.zeros((n, n))
        cB = np.zeros((n, m))
        ll = 0.0
        saw_data = False
        for pdf in batches:
            for obs in pdf["obs"]:
                if obs is None or len(obs) == 0:
                    continue
                saw_data = True
                o = np.asarray(obs, dtype=np.int64)
                path, score = _viterbi_one(log_pi, log_A, log_B, o)
                ll += score
                cpi[path[0]] += 1.0
                if path.shape[0] > 1:
                    np.add.at(cA, (path[:-1], path[1:]), 1.0)
                np.add.at(cB, (path, o), 1.0)
        if not saw_data:
            return
        kinds = [KIND_INITIAL] * n
        iis = [0] * n
        jjs = list(range(n))
        weights = list(cpi)
        for i in range(n):
            kinds += [KIND_TRANSITION] * n
            iis += [i] * n
            jjs += list(range(n))
            weights += list(cA[i])
        for i in range(n):
            kinds += [KIND_EMISSION] * m
            iis += [i] * m
            jjs += list(range(m))
            weights += list(cB[i])
        kinds.append(KIND_LOGLIK)
        iis.append(0)
        jjs.append(0)
        weights.append(ll)
        yield pd.DataFrame(
            {"kind": kinds, "i": np.array(iis, dtype=np.int32),
             "j": np.array(jjs, dtype=np.int32), "weight": weights}
        )

    return compute


def hard_counts(sequences: DataFrame, bc_log_model) -> DataFrame:
    """One hard-EM pass over the corpus -> aggregated (kind, i, j, weight)
    counts, including the loglik side-channel row."""
    raw = sequences.select("obs").mapInPandas(
        hard_count_udf(bc_log_model), schema=COUNTS_SCHEMA
    )
    return raw.groupBy("kind", "i", "j").agg(F.sum("weight").alias("weight"))


def viterbi_reestimate(
    spark: SparkSession, sequences: DataFrame, model: HMM
) -> DataFrame:
    """One distributed hard-EM re-estimation step as a tidy DataFrame
    (kind, i, j, prob): Viterbi-decode under ``model``, count path events,
    normalize per (kind, i) row.

    Zero-count (i, j) cells are ABSENT from the output (sparse counts, like
    operators.markov.transition_model) — states the decoded paths never
    visit produce no rows rather than a uniform fallback; the fit_viterbi
    loop applies the uniform fallback driver-side (kernel.m_step).
    Integer-count / integer-count division is one exact IEEE op on both
    engines, so the oracle needs no rounding."""
    with np.errstate(divide="ignore"):
        bc = spark.sparkContext.broadcast(
            (np.log(model.pi), np.log(model.A), np.log(model.B))
        )
    counts = hard_counts(sequences, bc)
    return normalize_counts(counts.filter(F.col("weight") > 0))


def viterbi_reestimate_oracle_sql(model: HMM) -> str:
    """DuckDB oracle for viterbi_reestimate: the shared Viterbi DP CTEs
    (decode.viterbi_ctes — bitwise-equal deltas, identical argmax tiebreak)
    followed by plain relational counting over the per-(seq, t) state rows:
    ``back`` holds the Viterbi state at every step, ``coded`` the emitted
    symbol, so init / transition / emission counts are one GROUP BY each and
    the normalize is the same count/count window as the Spark side."""
    return f"""
WITH {viterbi_ctes(model)},
states AS MATERIALIZED (SELECT user_id, t, state FROM back),
raw AS (
  SELECT '{KIND_INITIAL}' AS kind, 0 AS i, state AS j, count(*)::DOUBLE AS weight
  FROM states WHERE t = 0 GROUP BY state
  UNION ALL
  SELECT '{KIND_TRANSITION}', a.state, b.state, count(*)::DOUBLE
  FROM states a JOIN states b ON b.user_id = a.user_id AND b.t = a.t + 1
  GROUP BY a.state, b.state
  UNION ALL
  SELECT '{KIND_EMISSION}', s.state, c.sym, count(*)::DOUBLE
  FROM states s JOIN coded c ON c.user_id = s.user_id AND c.t = s.t
  GROUP BY s.state, c.sym
)
SELECT kind, i::INTEGER AS i, j::INTEGER AS j,
       weight / sum(weight) OVER (PARTITION BY kind, i) AS prob
FROM raw
"""


def fit_viterbi(
    spark: SparkSession,
    sequences: DataFrame,
    init: HMM,
    max_iter: int = 10,
    tol: float = 0.0,
    topology_mask: np.ndarray | None = None,
) -> FitResult:
    """Distributed segmental k-means loop: per iteration broadcast the
    log-model, hard-count via one mapInPandas pass, collect the tiny count
    blocks, normalize driver-side (kernel.m_step — zero-mass rows fall back
    to uniform), and test convergence on the Viterbi joint log-likelihood.

    Same cache discipline as fit(): persists the corpus only if the caller
    didn't, and then unpersists it.

    ``topology_mask``: structural transition topology, same contract as
    ``fit(topology_mask=...)``. Hard EM preserves it on its own even more
    directly than soft EM — log A carries -inf at masked entries, so no
    Viterbi path ever uses one and masked counts are exactly zero — but
    ``m_step``'s uniform fallback for never-visited states must still be
    re-masked (uniform over allowed, not the full row)."""
    model = init.validate()
    if topology_mask is not None:
        from baum_welch_spark.hmm.fit import _masked

        topology_mask = np.asarray(topology_mask, dtype=bool)
        model = _masked(model, topology_mask)
    sc = spark.sparkContext
    caller_persisted = sequences.storageLevel.useMemory or sequences.storageLevel.useDisk
    if not caller_persisted:
        sequences = sequences.persist(StorageLevel.MEMORY_AND_DISK)
    trace: list[float] = []
    converged = False
    iterations = 0
    try:
        for it in range(max_iter):
            with np.errstate(divide="ignore"):
                bc = sc.broadcast((np.log(model.pi), np.log(model.A), np.log(model.B)))
            try:
                rows = hard_counts(sequences, bc).collect()
            finally:
                bc.unpersist()
            n, m = model.n_hidden, model.n_observed
            cpi = np.zeros(n)
            cA = np.zeros((n, n))
            cB = np.zeros((n, m))
            ll = 0.0
            for r in rows:
                if r.kind == KIND_LOGLIK:
                    ll += r.weight
                elif r.kind == KIND_INITIAL:
                    cpi[r.j] += r.weight
                elif r.kind == KIND_TRANSITION:
                    cA[r.i, r.j] += r.weight
                elif r.kind == KIND_EMISSION:
                    cB[r.i, r.j] += r.weight
            trace.append(ll)
            new_model = m_step(cpi, cA, cB)
            if topology_mask is not None:
                from baum_welch_spark.hmm.fit import _masked

                new_model = _masked(new_model, topology_mask)
            delta = model.distance(new_model)
            model = new_model
            iterations = it + 1
            # hard EM's loglik is not monotone in general; converge on the
            # model-space Frobenius distance like the reference's D4 test
            if tol > 0 and delta < tol:
                converged = True
                break
    finally:
        if not caller_persisted:
            sequences.unpersist()
    return FitResult(model=model, loglik_trace=trace, iterations=iterations, converged=converged)


def sequential_viterbi_train(
    init: HMM,
    sequences: list[np.ndarray],
    max_iter: int = 10,
    tol: float = 0.0,
) -> tuple[HMM, list[float]]:
    """Single-process segmental k-means — the oracle fit_viterbi must match
    to 1e-12 (hard counts are integers, so the only float ops are the final
    divisions, identical on both sides)."""
    model = init.validate()
    trace: list[float] = []
    for _ in range(max_iter):
        with np.errstate(divide="ignore"):
            log_pi, log_A, log_B = np.log(model.pi), np.log(model.A), np.log(model.B)
        n, m = model.n_hidden, model.n_observed
        cpi = np.zeros(n)
        cA = np.zeros((n, n))
        cB = np.zeros((n, m))
        ll = 0.0
        for o in sequences:
            path, score = _viterbi_one(log_pi, log_A, log_B, o)
            ll += score
            cpi[path[0]] += 1.0
            if path.shape[0] > 1:
                np.add.at(cA, (path[:-1], path[1:]), 1.0)
            np.add.at(cB, (path, o), 1.0)
        trace.append(ll)
        new_model = m_step(cpi, cA, cB)
        delta = model.distance(new_model)
        model = new_model
        if tol > 0 and delta < tol:
            break
    return model, trace
