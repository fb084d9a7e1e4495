"""Gaussian-emission HMM: the continuous-observation second model family.

The reference engine is discrete-only (its ``HmmModel`` emission matrix is
N x M over a finite alphabet, BaumWelchUtils.java:127-134); Rabiner 1989
§VI extends the same EM machinery to continuous densities. This module
re-expresses that published extension over the engine's existing
distributed-stripe architecture (hmm/fit.py): per Arrow batch the E-step
accumulates model-sized sufficient statistics — initial γ₀, transition ξ
sums, and per-state emission MOMENTS (Σγ, Σγx, Σγx²) instead of per-symbol
counts — one Catalyst partial agg combines them, and the driver's M-step is
closed-form:

    μ_j  = Σ_t γ_t(j) x_t / Σ_t γ_t(j)
    σ²_j = Σ_t γ_t(j) x_t² / Σ_t γ_t(j) − μ_j²      (floored for safety)

Observations are the ``events.value`` column (sequences built by
:func:`build_value_sequences` with the same (ts, event_id) total order as
the discrete corpus).

Decode/score are DuckDB-exact where the discrete family is: the Gaussian
log-density ``c1_j − (x − μ_j)²·c2_j`` (c1 = −½ln 2πσ², c2 = 1/2σ²,
precomputed doubles embedded as literals) is plain SQL arithmetic, so the
same recursive-CTE Viterbi/forward oracles pin the distributed kernels
bit-for-bit modulo the engines' ln/exp last-ulp, absorbed by round(6).

Scale posture: identical to the discrete family — model broadcast, narrow
``mapInPandas`` E-step, one model-sized shuffle per iteration, no
data-sized driver materialization.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

VAR_FLOOR = 1e-6

KIND_INITIAL = "initial"
KIND_TRANSITION = "transition"
KIND_MOMENT = "moment"  # j = 0 (Σγ), 1 (Σγx), 2 (Σγx²)
KIND_LOGLIK = "loglik"

GCOUNTS_SCHEMA = "kind string, i int, j int, weight double"
VALUE_SEQUENCES_SCHEMA = "seq_id bigint, obs array<double>"


@dataclass(frozen=True)
class GaussianHMM:
    pi: np.ndarray  # (N,)
    A: np.ndarray  # (N, N)
    mu: np.ndarray  # (N,)
    sigma2: np.ndarray  # (N,)

    def validate(self) -> "GaussianHMM":
        pi, A, mu, s2 = (np.asarray(x, dtype=np.float64) for x in
                         (self.pi, self.A, self.mu, self.sigma2))
        n = pi.shape[0]
        if A.shape != (n, n) or mu.shape != (n,) or s2.shape != (n,):
            raise ValueError(f"inconsistent shapes: pi{pi.shape} A{A.shape} mu{mu.shape} s2{s2.shape}")
        if not np.allclose(pi.sum(), 1.0, atol=1e-8):
            raise ValueError("pi must sum to 1")
        if not np.allclose(A.sum(axis=1), 1.0, atol=1e-8):
            raise ValueError("A rows must sum to 1")
        if (s2 <= 0).any():
            raise ValueError("sigma2 must be positive")
        return GaussianHMM(pi=pi, A=A, mu=mu, sigma2=s2)

    @staticmethod
    def random(
        n_hidden: int, seed: int | None = None, lo: float = 0.0, hi: float = 1.0
    ) -> "GaussianHMM":
        """Seeded init: row-stochastic pi/A (the discrete convention,
        model.HMM.random), means spread evenly over [lo, hi] with seeded
        jitter, variances at the squared inter-mean spacing — components
        start separated, the standard continuous-EM init."""
        rng = np.random.default_rng(seed)

        def stochastic(*shape: int) -> np.ndarray:
            x = rng.random(shape) + 0.1
            return x / x.sum(axis=-1, keepdims=True)

        span = (hi - lo) / n_hidden
        mu = lo + span * (np.arange(n_hidden) + 0.25 + 0.5 * rng.random(n_hidden))
        sigma2 = np.full(n_hidden, max(span * span, VAR_FLOOR))
        return GaussianHMM(
            pi=stochastic(n_hidden), A=stochastic(n_hidden, n_hidden),
            mu=mu, sigma2=sigma2,
        ).validate()

    def to_df(self, spark: SparkSession) -> DataFrame:
        """Tidy model frame (kind, i, j, value): initial/transition rows
        carry probabilities; moment rows carry μ (j=0) and σ² (j=1)."""
        n = self.pi.shape[0]
        rows = []
        for j in range(n):
            rows.append((KIND_INITIAL, 0, j, float(self.pi[j])))
        for i in range(n):
            for j in range(n):
                rows.append((KIND_TRANSITION, i, j, float(self.A[i][j])))
        for i in range(n):
            rows.append((KIND_MOMENT, i, 0, float(self.mu[i])))
            rows.append((KIND_MOMENT, i, 1, float(self.sigma2[i])))
        return spark.createDataFrame(rows, schema="kind string, i int, j int, value double")

    def write(self, spark: SparkSession, path: str) -> None:
        """Persist as the tidy (kind, i, j, value) parquet — the Gaussian
        twin of HMM.write's model codec (S3)."""
        self.to_df(spark).repartition(1).write.mode("overwrite").parquet(path)

    @staticmethod
    def read(spark: SparkSession, path: str) -> "GaussianHMM":
        rows = spark.read.parquet(path).collect()
        n = max(r.j for r in rows if r.kind == KIND_INITIAL) + 1
        pi = np.zeros(n)
        A = np.zeros((n, n))
        mu = np.zeros(n)
        s2 = np.zeros(n)
        for r in rows:
            if r.kind == KIND_INITIAL:
                pi[r.j] = r.value
            elif r.kind == KIND_TRANSITION:
                A[r.i, r.j] = r.value
            elif r.kind == KIND_MOMENT:
                (mu if r.j == 0 else s2)[r.i] = r.value
        return GaussianHMM(pi=pi, A=A, mu=mu, sigma2=s2).validate()

    def distance(self, other: "GaussianHMM") -> float:
        return float(
            max(
                np.abs(self.pi - other.pi).max(),
                np.abs(self.A - other.A).max(),
                np.abs(self.mu - other.mu).max(),
                np.abs(self.sigma2 - other.sigma2).max(),
            )
        )


def _log_coeffs(model: GaussianHMM) -> tuple[np.ndarray, np.ndarray]:
    """(c1, c2) with log N(x; μ_j, σ²_j) = c1_j − (x − μ_j)·(x − μ_j)·c2_j —
    the exact expression shape the SQL oracles embed, so both engines run
    the same two-operand IEEE arithmetic."""
    c1 = -0.5 * np.log(2.0 * np.pi * model.sigma2)
    c2 = 1.0 / (2.0 * model.sigma2)
    return c1, c2


def log_emissions(model: GaussianHMM, x: np.ndarray) -> np.ndarray:
    """(T, N) log-densities, elementwise c1 − d·d·c2 (see _log_coeffs)."""
    c1, c2 = _log_coeffs(model)
    d = x[:, None] - model.mu[None, :]
    return c1[None, :] - (d * d) * c2[None, :]


def forward_backward_gauss(
    model: GaussianHMM, x: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray, float]:
    """Rabiner-scaled forward/backward with per-t Gaussian densities.
    Returns (alpha_hat, beta_hat, scale, loglik); same convention as the
    discrete kernel (hmm/kernel.py module doc)."""
    b = np.exp(log_emissions(model, x))  # (T, N)
    T, N = b.shape
    alpha = np.empty((T, N))
    beta = np.empty((T, N))
    scale = np.empty(T)
    a = model.pi * b[0]
    scale[0] = a.sum()
    # underflow guard: once a fitted sigma2 hits VAR_FLOOR=1e-6, exp()
    # underflows to 0 beyond |x-mu| ~ 0.04 — an all-zero emission row makes
    # scale[t]=0, which without this check silently NaNs every downstream
    # alpha/loglik through fit/score/decode instead of surfacing an error.
    if scale[0] == 0.0:
        raise FloatingPointError(
            "forward_backward_gauss: zero forward mass at t=0 — every "
            "state's density underflowed (far-outlier observation or a "
            "collapsed sigma2); widen the variance floor or rescale inputs"
        )
    alpha[0] = a / scale[0]
    for t in range(1, T):
        a = (alpha[t - 1] @ model.A) * b[t]
        scale[t] = a.sum()
        if scale[t] == 0.0:
            raise FloatingPointError(
                f"forward_backward_gauss: zero forward mass at t={t} — "
                "every state's density underflowed (far-outlier "
                "observation or a collapsed sigma2); widen the variance "
                "floor or rescale inputs"
            )
        alpha[t] = a / scale[t]
    beta[T - 1] = 1.0
    for t in range(T - 2, -1, -1):
        beta[t] = (model.A @ (b[t + 1] * beta[t + 1])) / scale[t + 1]
    return alpha, beta, scale, float(np.log(scale).sum())


def e_step_moments(
    model: GaussianHMM,
    x: np.ndarray,
    out_pi: np.ndarray,
    out_A: np.ndarray,
    out_m: np.ndarray,  # (N, 3): Σγ, Σγx, Σγx²
) -> float:
    """Accumulate one sequence's expected counts + emission moments."""
    b = np.exp(log_emissions(model, x))
    alpha, beta, scale, ll = forward_backward_gauss(model, x)
    gamma = alpha * beta  # rows sum to 1
    out_pi += gamma[0]
    if x.shape[0] > 1:
        w = b[1:] * beta[1:] / scale[1:, None]
        out_A += (alpha[:-1].T @ w) * model.A
    out_m[:, 0] += gamma.sum(axis=0)
    out_m[:, 1] += gamma.T @ x
    out_m[:, 2] += gamma.T @ (x * x)
    return ll


def m_step_gauss(
    prev: GaussianHMM,
    count_pi: np.ndarray,
    count_A: np.ndarray,
    moments: np.ndarray,
    var_floor: float = VAR_FLOOR,
) -> GaussianHMM:
    """Closed-form M-step; zero-mass states keep their previous emission
    parameters (standard EM practice for starved components) and uniform
    pi/A rows (the discrete m_step convention)."""

    def norm(xx: np.ndarray) -> np.ndarray:
        s = xx.sum(axis=-1, keepdims=True)
        safe = np.where(s > 0, s, 1.0)
        uniform = np.full_like(xx, 1.0 / xx.shape[-1])
        return np.where(s > 0, xx / safe, uniform)

    c0 = moments[:, 0]
    ok = c0 > 0
    mu = np.where(ok, moments[:, 1] / np.where(ok, c0, 1.0), prev.mu)
    ex2 = np.where(ok, moments[:, 2] / np.where(ok, c0, 1.0), prev.sigma2 + prev.mu**2)
    sigma2 = np.maximum(ex2 - mu * mu, var_floor)
    return GaussianHMM(
        pi=norm(count_pi), A=norm(count_A), mu=mu, sigma2=sigma2
    ).validate()


def sequential_gauss_em(
    init: GaussianHMM, sequences: list[np.ndarray], max_iter: int = 10
) -> tuple[GaussianHMM, list[float]]:
    """In-memory NumPy oracle loop — the fit_gaussian parity reference."""
    model = init.validate()
    trace: list[float] = []
    for _ in range(max_iter):
        n = model.pi.shape[0]
        cpi, cA, cm = np.zeros(n), np.zeros((n, n)), np.zeros((n, 3))
        ll = 0.0
        for x in sequences:
            ll += e_step_moments(model, np.asarray(x, dtype=np.float64), cpi, cA, cm)
        trace.append(ll)
        model = m_step_gauss(model, cpi, cA, cm)
    return model, trace


def build_value_sequences(
    events: DataFrame,
    entity_col: str = "user_id",
    value_col: str = "value",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """events -> (seq_id, obs array<double>): the continuous twin of
    operators.sequences.build_sequences — same (ts, tiebreak) total order,
    same single-shuffle collect_list/array_sort/transform plan, no symbol
    dictionary (values pass through as doubles)."""
    return (
        events.groupBy(F.col(entity_col).cast("bigint").alias("seq_id"))
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(F.col(ts_col), F.col(tiebreak_col),
                                 F.col(value_col).cast("double").alias("x"))
                    )
                ),
                lambda s: s["x"],
            ).alias("obs")
        )
    )


@dataclass
class GaussFitResult:
    model: GaussianHMM
    loglik_trace: list[float]
    iterations: int
    converged: bool


def _gauss_estep_udf(bc_model):
    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = bc_model.value
        n = model.pi.shape[0]
        cpi, cA, cm = np.zeros(n), np.zeros((n, n)), np.zeros((n, 3))
        ll, saw = 0.0, False
        for pdf in batches:
            for obs in pdf["obs"]:
                if obs is None or len(obs) == 0:
                    continue
                saw = True
                ll += e_step_moments(
                    model, np.asarray(obs, dtype=np.float64), cpi, cA, cm
                )
        if not saw:
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
            kinds += [KIND_MOMENT] * 3
            iis += [i] * 3
            jjs += [0, 1, 2]
            weights += list(cm[i])
        kinds.append(KIND_LOGLIK)
        iis.append(0)
        jjs.append(0)
        weights.append(ll)
        yield pd.DataFrame(
            {"kind": kinds, "i": np.array(iis, dtype=np.int32),
             "j": np.array(jjs, dtype=np.int32), "weight": weights}
        )

    return compute


def fit_gaussian(
    spark: SparkSession,
    sequences: DataFrame,
    init: GaussianHMM,
    max_iter: int = 10,
    tol: float = 0.0,
) -> GaussFitResult:
    """Distributed EM for the Gaussian family — the fit.py loop shape:
    broadcast model -> E-step mapInPandas -> model-sized groupBy sum ->
    collect stripes -> closed-form M-step -> convergence test."""
    model = init.validate()
    trace: list[float] = []
    converged = False
    # materialize the sequence build once across EM iterations (the discrete
    # fit()'s persist pattern, guide §3.3/§5): without it every iteration's
    # E-step re-runs the corpus groupBy/collect_list from the events scan —
    # max_iter corpus shuffles for one build's worth of work. Lazy local
    # checkpoint: the first E-step materializes it; partitioning equals the
    # un-checkpointed plan's post-AQE layout, so per-task accumulation order
    # (and hence every float) is unchanged.
    src = sequences.select("obs").localCheckpoint(eager=False)
    it = 0
    for it in range(1, max_iter + 1):
        bc = spark.sparkContext.broadcast(model)
        agg = (
            src.mapInPandas(_gauss_estep_udf(bc), schema=GCOUNTS_SCHEMA)
            .groupBy("kind", "i", "j")
            .agg(F.sum("weight").alias("weight"))
            .collect()
        )
        bc.destroy()
        n = model.pi.shape[0]
        cpi, cA, cm = np.zeros(n), np.zeros((n, n)), np.zeros((n, 3))
        ll = 0.0
        for r in agg:
            if r.kind == KIND_LOGLIK:
                ll = r.weight
            elif r.kind == KIND_INITIAL:
                cpi[r.j] = r.weight
            elif r.kind == KIND_TRANSITION:
                cA[r.i, r.j] = r.weight
            elif r.kind == KIND_MOMENT:
                cm[r.i, r.j] = r.weight
        trace.append(ll)
        new_model = m_step_gauss(model, cpi, cA, cm)
        delta = model.distance(new_model)
        model = new_model
        if tol > 0 and delta < tol:
            converged = True
            break
    return GaussFitResult(model=model, loglik_trace=trace, iterations=it, converged=converged)


# --- decode / score (DuckDB-exact faces) -----------------------------------


def _viterbi_gauss_one(model: GaussianHMM, x: np.ndarray) -> tuple[np.ndarray, float]:
    with np.errstate(divide="ignore"):
        lpi, lA = np.log(model.pi), np.log(model.A)
    logb = log_emissions(model, x)
    T, N = logb.shape
    delta = np.empty((T, N))
    back = np.zeros((T, N), dtype=np.int64)
    delta[0] = lpi + logb[0]
    for t in range(1, T):
        cand = delta[t - 1][:, None] + lA  # (i, j)
        back[t] = np.argmax(cand, axis=0)
        delta[t] = cand[back[t], np.arange(N)] + logb[t]
    path = np.empty(T, dtype=np.int64)
    path[T - 1] = int(np.argmax(delta[T - 1]))
    for t in range(T - 2, -1, -1):
        path[t] = back[t + 1][path[t + 1]]
    return path, float(np.max(delta[T - 1]))


def viterbi_gauss(
    spark: SparkSession, sequences: DataFrame, model: GaussianHMM
) -> DataFrame:
    """(seq_id, loglik, path_str): MAP state path under the Gaussian model.
    Face-shaped output (path as comma-joined string, loglik rounded by the
    caller) — broadcast model, narrow Arrow map, no shuffle."""
    model = model.validate()
    bc = spark.sparkContext.broadcast(model)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        m = bc.value
        for pdf in batches:
            ids, lls, paths = [], [], []
            for seq_id, obs in zip(pdf["seq_id"], pdf["obs"]):
                if obs is None or len(obs) == 0:
                    continue
                path, ll = _viterbi_gauss_one(m, np.asarray(obs, dtype=np.float64))
                ids.append(int(seq_id))
                lls.append(ll)
                paths.append(",".join(str(int(s)) for s in path))
            yield pd.DataFrame({"seq_id": ids, "loglik": lls, "path_str": paths})

    return sequences.mapInPandas(decode, schema="seq_id bigint, loglik double, path_str string")


def viterbi_gauss_face(
    spark: SparkSession, sequences: DataFrame, model: GaussianHMM
) -> DataFrame:
    return viterbi_gauss(spark, sequences, model).select(
        "seq_id", F.round("loglik", 6).alias("loglik"), "path_str"
    )


def score_gauss(
    spark: SparkSession, sequences: DataFrame, model: GaussianHMM
) -> DataFrame:
    """(seq_id, t_len, loglik, avg_loglik): marginal log-likelihood via the
    scaled forward recursion."""
    return _score_gauss_unchecked(spark, sequences, model.validate())


def _score_gauss_unchecked(
    spark: SparkSession, sequences: DataFrame, model: GaussianHMM
) -> DataFrame:
    """score_gauss body without the validate() gate: the chained loglik
    trace (ghmm_loglik_trace) scores under 6-dp-ROUNDED models whose pi/A
    sums are off by up to ~2e-6 — within the trace contract but outside
    validate's 1e-8 (the _ghmm_reestimate_unchecked convention)."""
    bc = spark.sparkContext.broadcast(model)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        m = bc.value
        for pdf in batches:
            ids, tls, lls = [], [], []
            for seq_id, obs in zip(pdf["seq_id"], pdf["obs"]):
                if obs is None or len(obs) == 0:
                    continue
                x = np.asarray(obs, dtype=np.float64)
                _, _, _, ll = forward_backward_gauss(m, x)
                ids.append(int(seq_id))
                tls.append(len(x))
                lls.append(ll)
            yield pd.DataFrame(
                {"seq_id": ids, "t_len": np.array(tls, dtype=np.int32),
                 "loglik": lls, "avg_loglik": [l / t for l, t in zip(lls, tls)]}
            )

    return sequences.mapInPandas(
        score, schema="seq_id bigint, t_len int, loglik double, avg_loglik double"
    )


def score_gauss_face(
    spark: SparkSession, sequences: DataFrame, model: GaussianHMM
) -> DataFrame:
    return score_gauss(spark, sequences, model).select(
        "seq_id", "t_len",
        F.round("loglik", 6).alias("loglik"),
        F.round("avg_loglik", 6).alias("avg_loglik"),
    )


# SQL oracle machinery: self-contained (decode.py's generators stay
# untouched so the discrete faces' source hashes are stable), sharing only
# the literal formatter.

_GCODED_SQL = """
  SELECT user_id,
         value AS x,
         (row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1) AS t
  FROM events
"""


def _logb_expr(model: GaussianHMM, j: int, xref: str) -> str:
    """SQL for log N(x; μ_j, σ²_j) with the exact literal/operation shape
    log_emissions uses: c1 − (x − μ)·(x − μ)·c2."""
    from baum_welch_spark.hmm.decode import _lit

    c1, c2 = _log_coeffs(model)
    mu = _lit(model.mu[j])
    return f"({_lit(c1[j])} - ({xref} - {mu}) * ({xref} - {mu}) * {_lit(c2[j])})"


def gauss_viterbi_oracle_sql(model: GaussianHMM) -> str:
    """DuckDB oracle for viterbi_gauss_face: the log-space Viterbi DP as
    recursive CTEs (the decode.py viterbi_ctes shape) with the emission
    lookup replaced by the inline Gaussian log-density. Deltas are the same
    two-operand IEEE sums both engines compute; ties resolve first-max."""
    from baum_welch_spark.hmm.decode import _argmax_case, _lit

    model = model.validate()
    N = model.pi.shape[0]
    with np.errstate(divide="ignore"):
        lpi, lA = np.log(model.pi), np.log(model.A)
    j1 = range(1, N + 1)
    base_d = ",\n         ".join(
        f"{_lit(lpi[j - 1])} + {_logb_expr(model, j - 1, 'c.x')} AS d{j}" for j in j1
    )
    step_d = ",\n         ".join(
        "greatest("
        + ", ".join(f"p.d{i} + {_lit(lA[i - 1][j - 1])}" for i in j1)
        + f") + {_logb_expr(model, j - 1, 'c.x')} AS d{j}"
        for j in j1
    )
    final_argmax = _argmax_case([f"d.d{j}" for j in j1])
    back_cand = [
        f"(d.d{i} + CASE b.state "
        + " ".join(f"WHEN {j - 1} THEN {_lit(lA[i - 1][j - 1])}" for j in j1)
        + " END)"
        for i in j1
    ]
    back_argmax = _argmax_case(back_cand)
    dmax = ", ".join(f"d.d{j}" for j in j1)
    return f"""
WITH coded AS MATERIALIZED ({_GCODED_SQL}),
lens AS MATERIALIZED (SELECT user_id, count(*) AS t_len FROM coded GROUP BY user_id),
delta AS MATERIALIZED (
  WITH RECURSIVE delta_r AS (
    SELECT c.user_id, 0 AS t,
           {base_d}
    FROM coded c WHERE c.t = 0
    UNION ALL
    SELECT p.user_id, p.t + 1,
           {step_d}
    FROM delta_r p JOIN coded c ON c.user_id = p.user_id AND c.t = p.t + 1
  ) SELECT * FROM delta_r
),
back AS MATERIALIZED (
  WITH RECURSIVE back_r AS (
    SELECT d.user_id, d.t,
           ({final_argmax}) AS state,
           greatest({dmax}) AS loglik,
           ({final_argmax})::VARCHAR AS path
    FROM delta d JOIN lens l ON l.user_id = d.user_id AND d.t = l.t_len - 1
    UNION ALL
    SELECT b.user_id, b.t - 1,
           ({back_argmax}) AS state,
           b.loglik,
           ({back_argmax})::VARCHAR || ',' || b.path AS path
    FROM back_r b JOIN delta d ON d.user_id = b.user_id AND d.t = b.t - 1
  ) SELECT * FROM back_r
)
SELECT user_id AS seq_id, round(loglik, 6) AS loglik, path AS path_str
FROM back WHERE t = 0
"""


def gauss_score_oracle_sql(model: GaussianHMM) -> str:
    """DuckDB oracle for score_gauss_face: the scaled forward recursion
    (score_oracle_sql's alpha CTE shape) with densities exp(logb) inline."""
    from baum_welch_spark.hmm.decode import _lit

    model = model.validate()
    N = model.pi.shape[0]
    j1 = range(1, N + 1)
    base_u = ",\n         ".join(
        f"{_lit(model.pi[j - 1])} * exp({_logb_expr(model, j - 1, 'c.x')}) AS u{j}"
        for j in j1
    )
    step_u = ",\n         ".join(
        "("
        + " + ".join(f"a.p{i} * {_lit(model.A[i - 1][j - 1])}" for i in j1)
        + f") * exp({_logb_expr(model, j - 1, 'c.x')}) AS nu{j}"
        for j in j1
    )
    usum = " + ".join(f"u{j}" for j in j1)
    nusum = " + ".join(f"nu{j}" for j in j1)
    norm = ", ".join(f"u{j} / s AS p{j}" for j in j1)
    nnorm = ", ".join(f"nu{j} / ns AS np{j}" for j in j1)
    return f"""
WITH coded AS MATERIALIZED ({_GCODED_SQL}),
lens AS MATERIALIZED (SELECT user_id, count(*) AS t_len FROM coded GROUP BY user_id),
alpha AS MATERIALIZED (
  WITH RECURSIVE alpha_r AS (
    SELECT c.user_id, 0 AS t,
           {base_u},
           ({usum}) AS s, ln(s) AS ll, {norm}
    FROM coded c WHERE c.t = 0
    UNION ALL
    SELECT a.user_id, a.t + 1,
           {step_u},
           ({nusum}) AS ns, a.ll + ln(ns) AS nll, {nnorm}
    FROM alpha_r a JOIN coded c ON c.user_id = a.user_id AND c.t = a.t + 1
  ) SELECT * FROM alpha_r
)
SELECT a.user_id AS seq_id, l.t_len::INTEGER AS t_len,
       round(a.ll, 6) AS loglik, round(a.ll / l.t_len, 6) AS avg_loglik
FROM alpha a JOIN lens l ON l.user_id = a.user_id AND a.t = l.t_len - 1
"""


def ghmm_reestimate(
    spark: SparkSession, sequences: DataFrame, model: GaussianHMM
) -> DataFrame:
    """One distributed Gaussian SOFT-EM re-estimation step as a tidy
    DataFrame (kind, i, j, val) — the continuous twin of fit.em_reestimate
    (reference M4/M5/M6 stripes, BaumWelchMapper.java:157-240, with the
    emission stripe replaced by the Σγ/Σγx/Σγx² moment accumulators and
    the closed-form M-step): under a FIXED ``model``,

    - ``initial``/``transition`` rows carry the window-normalized expected
      counts (γ₀ for pi, Σ_t ξ for A — the discrete A4 normalize),
    - ``mu`` rows carry Σγx/Σγ per state (j = 0),
    - ``var`` rows carry max(Σγx²/Σγ − mu², VAR_FLOOR) per state (j = 0).

    This is the DuckDB-exact pin for the GAUSSIAN distributed E-step
    end-to-end (graduating ghmm_fit's evidence past the rows-only check,
    VERDICT-r9 #3): the oracle (gauss_reestimate_oracle_sql) recomputes
    γ/ξ/moments from the scaled forward/backward recursive CTEs with the
    log-density inline from literals and must land on the same
    6-dp-rounded values. Counts are strictly positive for a dense random
    model; the weight>0 filter mirrors the oracle's HAVING (the sparse-
    output contract em_reestimate documents)."""
    return _ghmm_reestimate_unchecked(spark, sequences, model.validate())


def _ghmm_reestimate_unchecked(
    spark: SparkSession, sequences: DataFrame, model: GaussianHMM
) -> DataFrame:
    """ghmm_reestimate body without the validate() gate: the chained trace
    (ghmm_em_trace) feeds 6-dp-ROUNDED models whose pi/A sums are off by up
    to ~2e-6 — within the trace contract but outside validate's 1e-8."""
    from pyspark.sql import Window

    bc = spark.sparkContext.broadcast(model)
    counts = (
        sequences.select("obs")
        .mapInPandas(_gauss_estep_udf(bc), schema=GCOUNTS_SCHEMA)
        .groupBy("kind", "i", "j")
        .agg(F.sum("weight").alias("weight"))
    )
    w = Window.partitionBy("kind", "i")
    probs = (
        counts.filter(F.col("kind").isin(KIND_INITIAL, KIND_TRANSITION))
        .filter(F.col("weight") > 0)
        .withColumn("val", F.col("weight") / F.sum("weight").over(w))
        .select("kind", "i", "j", F.round("val", 6).alias("val"))
    )
    m = (
        counts.filter(F.col("kind") == KIND_MOMENT)
        .groupBy("i")
        .agg(
            F.sum(F.when(F.col("j") == 0, F.col("weight"))).alias("m0"),
            F.sum(F.when(F.col("j") == 1, F.col("weight"))).alias("m1"),
            F.sum(F.when(F.col("j") == 2, F.col("weight"))).alias("m2"),
        )
    )
    # the SAME two-operand expression shapes the oracle embeds:
    # mu = m1/m0, var = max(m2/m0 - mu*mu, floor)
    mu = F.col("m1") / F.col("m0")
    var = F.greatest(F.col("m2") / F.col("m0") - mu * mu, F.lit(VAR_FLOOR))
    mu_rows = m.select(
        F.lit("mu").alias("kind"), "i", F.lit(0).alias("j"),
        F.round(mu, 6).alias("val"),
    )
    var_rows = m.select(
        F.lit("var").alias("kind"), "i", F.lit(0).alias("j"),
        F.round(var, 6).alias("val"),
    )
    return probs.unionByName(mu_rows).unionByName(var_rows)


def _gfb_ctes(model: GaussianHMM) -> str:
    """Gaussian twin of decode._fb_ctes: shared coded/lens/alpha/beta
    WITH-prefix (scaled forward + scaled backward) with the emission
    probability computed inline as exp(c1 − (x−μ)²·c2) from full-precision
    literals. Ends with a trailing comma — append the consuming CTE."""
    from baum_welch_spark.hmm.decode import _lit

    N = model.pi.shape[0]
    pi, A = model.pi, model.A
    j1 = range(1, N + 1)
    base_u = ",\n         ".join(
        f"{_lit(pi[j - 1])} * exp({_logb_expr(model, j - 1, 'c.x')}) AS u{j}"
        for j in j1
    )
    step_u = ",\n         ".join(
        "("
        + " + ".join(f"a.p{i} * {_lit(A[i - 1][j - 1])}" for i in j1)
        + f") * exp({_logb_expr(model, j - 1, 'c.x')}) AS nu{j}"
        for j in j1
    )
    usum = " + ".join(f"u{j}" for j in j1)
    nusum = " + ".join(f"nu{j}" for j in j1)
    norm = ", ".join(f"u{j} / s AS p{j}" for j in j1)
    nnorm = ", ".join(f"nu{j} / ns AS np{j}" for j in j1)
    base_b = ", ".join(f"{_lit(1.0)} AS b{j}" for j in j1)
    step_b = ",\n         ".join(
        "("
        + " + ".join(
            f"{_lit(A[i - 1][j - 1])} * exp({_logb_expr(model, j - 1, 'c.x')}) * b.b{j}"
            for j in j1
        )
        + f") / a.s AS nb{i}"
        for i in j1
    )
    # MATERIALIZED is load-bearing (see decode._fb_ctes)
    return f"""
WITH coded AS MATERIALIZED ({_GCODED_SQL}),
lens AS MATERIALIZED (SELECT user_id, count(*) AS t_len FROM coded GROUP BY user_id),
alpha AS MATERIALIZED (
  WITH RECURSIVE alpha_r AS (
    SELECT c.user_id, 0 AS t,
           {base_u},
           ({usum}) AS s, {norm}
    FROM coded c WHERE c.t = 0
    UNION ALL
    SELECT a.user_id, a.t + 1,
           {step_u},
           ({nusum}) AS ns, {nnorm}
    FROM alpha_r a JOIN coded c ON c.user_id = a.user_id AND c.t = a.t + 1
  ) SELECT * FROM alpha_r
),
beta AS MATERIALIZED (
  WITH RECURSIVE beta_r AS (
    SELECT l.user_id, l.t_len - 1 AS t, {base_b}
    FROM lens l
    UNION ALL
    SELECT b.user_id, b.t - 1,
           {step_b}
    FROM beta_r b
    JOIN coded c ON c.user_id = b.user_id AND c.t = b.t
    JOIN alpha a ON a.user_id = b.user_id AND a.t = b.t
    WHERE b.t > 0
  ) SELECT * FROM beta_r
),
"""


def gauss_reestimate_oracle_sql(model: GaussianHMM) -> str:
    """ANSI-SQL (DuckDB) oracle for ghmm_reestimate: γ = alpha_hat·beta_hat
    (already sums to 1 per step), ξ_t(i,j) = p_i(t)·A_ij·exp(logb_j(x_{t+1}))
    ·b_j(t+1)/s(t+1), moments Σγ/Σγx/Σγx² by plain GROUP BYs, then the same
    count/Σcount window normalize and closed-form mu/var expressions as the
    Spark side. Engines sum in different float orders (~1e-12 agreement);
    both round to 6 dp."""
    from baum_welch_spark.hmm.decode import _lit

    model = model.validate()
    N = model.pi.shape[0]
    A = model.A
    j1 = range(1, N + 1)
    gcols = ",\n         ".join(f"al.p{j} * bt.b{j} AS g{j}" for j in j1)
    xcols = ",\n         ".join(
        f"al.p{i} * {_lit(A[i - 1][j - 1])} * exp({_logb_expr(model, j - 1, 'c.x')})"
        f" * bt.b{j} / a2.s AS x{i}_{j}"
        for i in j1
        for j in j1
    )
    init_branches = "\n  UNION ALL\n".join(
        f"  SELECT 'initial' AS kind, 0 AS i, {j - 1} AS j, sum(g{j}) AS weight FROM g WHERE t = 0 HAVING sum(g{j}) > 0"
        for j in j1
    )
    trans_branches = "\n  UNION ALL\n".join(
        f"  SELECT 'transition', {i - 1}, {j - 1}, sum(x{i}_{j}) FROM xi HAVING sum(x{i}_{j}) > 0"
        for i in j1
        for j in j1
    )
    moment_branches = "\n  UNION ALL\n".join(
        f"  SELECT {j - 1} AS i, sum(g.g{j}) AS m0, sum(g.g{j} * c.x) AS m1,"
        f" sum(g.g{j} * c.x * c.x) AS m2"
        f" FROM g JOIN coded c ON c.user_id = g.user_id AND c.t = g.t"
        for j in j1
    )
    return (
        _gfb_ctes(model)
        + f"""
g AS MATERIALIZED (
  SELECT al.user_id, al.t,
         {gcols}
  FROM alpha al JOIN beta bt ON bt.user_id = al.user_id AND bt.t = al.t
),
xi AS MATERIALIZED (
  SELECT al.user_id, al.t,
         {xcols}
  FROM alpha al
  JOIN alpha a2 ON a2.user_id = al.user_id AND a2.t = al.t + 1
  JOIN coded c ON c.user_id = al.user_id AND c.t = al.t + 1
  JOIN beta bt ON bt.user_id = al.user_id AND bt.t = al.t + 1
),
raw AS (
{init_branches}
  UNION ALL
{trans_branches}
),
m AS (
{moment_branches}
)
SELECT kind, i::INTEGER AS i, j::INTEGER AS j,
       round(weight / sum(weight) OVER (PARTITION BY kind, i), 6) AS val
FROM raw
UNION ALL
SELECT 'mu', i::INTEGER, 0, round(m1 / m0, 6) FROM m
UNION ALL
SELECT 'var', i::INTEGER, 0,
       round(greatest(m2 / m0 - (m1 / m0) * (m1 / m0), {_lit(VAR_FLOOR)}), 6)
FROM m
"""
    )


def gauss_model_from_tidy(rows, n_hidden: int) -> GaussianHMM:
    """Rebuild a :class:`GaussianHMM` from tidy ``(kind, i, j, val)`` rows
    (ghmm_reestimate's output; absent sparse cells are exactly 0). Does NOT
    validate — rounded rows sum to ~1 only (see ghmm_em_trace)."""
    pi = np.zeros(n_hidden)
    A = np.zeros((n_hidden, n_hidden))
    mu = np.zeros(n_hidden)
    s2 = np.zeros(n_hidden)
    for r in rows:
        if r["kind"] == KIND_INITIAL:
            pi[r["j"]] = r["val"]
        elif r["kind"] == KIND_TRANSITION:
            A[r["i"], r["j"]] = r["val"]
        elif r["kind"] == "mu":
            mu[r["i"]] = r["val"]
        elif r["kind"] == "var":
            s2[r["i"]] = r["val"]
    return GaussianHMM(pi=pi, A=A, mu=mu, sigma2=s2)


def ghmm_em_trace(
    spark: SparkSession, sequences: DataFrame, model: GaussianHMM, n_iters: int = 2
) -> DataFrame:
    """The Gaussian EM *loop* as a tidy trace — the continuous twin of
    fit.em_trace: ``n_iters`` chained re-estimation laps, lap k+1's model
    being lap k's 6-dp-rounded tidy output (modelOut -> modelIn,
    BaumWelchDriver.java:114-134). Output ``(iter, kind, i, j, val)``.

    Driver-exact pin for the Gaussian chaining: the oracle
    (:func:`gauss_trace_oracle_sql`) pivots lap k's output CTE into a
    one-row model CTE — including the log-density coefficients c1/c2
    recomputed INSIDE DuckDB from the rounded mu/var (`ln` may differ from
    np.log by ~1 ulp; far inside the 6-dp contract) — and feeds it to lap
    k+1's recursions, so no model values cross from the Python driver.
    Per-lap collect is model-sized (N^2 + 3N + N rows)."""
    if n_iters < 1:
        raise ValueError(f"n_iters must be >= 1, got {n_iters}")
    frames = []
    cur = model.validate()
    n = cur.pi.shape[0]
    schema = "iter int, kind string, i int, j int, val double"
    # one sequence build shared by every chained lap (guide §3.3): lap 1's
    # collect materializes it, lap 2+ (and the caller's final action) read
    # the checkpoint instead of re-running the corpus groupBy per lap
    if n_iters > 1:
        sequences = sequences.localCheckpoint(eager=False)
    for it in range(1, n_iters + 1):
        step = _ghmm_reestimate_unchecked(spark, sequences, cur)
        if it < n_iters:
            # laps before the last become literal frames from the rows the
            # chaining collects anyway — no persist, no recompute, no cache
            # accumulation across bench invocations (fit.em_trace's pattern)
            rows = step.collect()
            frames.append(
                spark.createDataFrame(
                    [(it, r.kind, r.i, r.j, r.val) for r in rows], schema
                )
            )
            cur = gauss_model_from_tidy([r.asDict() for r in rows], n)
        else:
            frames.append(
                step.select(F.lit(it).alias("iter"), "kind", "i", "j", "val")
            )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def ghmm_loglik_trace(
    spark: SparkSession, sequences: DataFrame, model: GaussianHMM, n_iters: int = 2
) -> DataFrame:
    """Per-(lap, sequence) marginal log-likelihood under the CHAINED EM
    models — lap k scores every sequence under the model ghmm_em_trace's
    lap k uses (lap 1 = the literal init, lap k+1 = lap k's 6-dp-rounded
    tidy re-estimate; modelOut -> modelIn, BaumWelchDriver.java:114-134,
    the convergence trace the reference's driver reads per iteration at
    BaumWelchDriver.java:196-207). Output ``(iter, seq_id, loglik)``.

    This is the driver-exact graduation of ghmm_trace's rows-only evidence
    (VERDICT-r12 #2): per-sequence logliks are sequential Σ_t ln(s_t)
    accumulations — the proven gauss_score_oracle_sql contract — so no
    cross-engine corpus-order float-summation enters, unlike a corpus
    TOTAL loglik (magnitude ~1e6 at sf0.1, where partition-order noise
    alone would break round(6)). Per-lap collect is model-sized."""
    if n_iters < 1:
        raise ValueError(f"n_iters must be >= 1, got {n_iters}")
    cur = model.validate()
    n = cur.pi.shape[0]
    frames = []
    # one sequence build shared by the 2*n_iters-1 consumers (each lap's
    # score pass + each non-final lap's re-estimate; guide §3.3)
    if n_iters > 1:
        sequences = sequences.localCheckpoint(eager=False)
    for it in range(1, n_iters + 1):
        frames.append(
            _score_gauss_unchecked(spark, sequences, cur).select(
                F.lit(it).alias("iter"),
                "seq_id",
                F.round("loglik", 6).alias("loglik"),
            )
        )
        if it < n_iters:
            rows = _ghmm_reestimate_unchecked(spark, sequences, cur).collect()
            cur = gauss_model_from_tidy([r.asDict() for r in rows], n)
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def gauss_trace_oracle_sql(model: GaussianHMM, n_iters: int = 2) -> str:
    """ANSI-SQL (DuckDB) oracle for :func:`ghmm_em_trace`: lap 1 runs the
    gauss_reestimate_oracle_sql recursions from full-precision literals;
    every later lap's pi/A/mu/var come from the previous lap's rounded
    output CTE pivoted into a one-row ``mw{k}`` CTE, with the log-density
    coefficients c1_j = -0.5 * ln(2*pi*var_j) and c2_j = 1/(2*var_j)
    computed as lateral columns in the pivot — the identical two-operand
    expression shapes _log_coeffs uses, so the only cross-engine delta is
    the ~1-ulp libm ln/exp class the existing exact faces already carry."""
    union = "\nUNION ALL\n".join(
        f"SELECT {k} AS iter, kind, i, j, val FROM m{k}"
        for k in range(1, n_iters + 1)
    )
    return _gauss_trace_ctes(model, n_iters) + f"\n{union}\n"


def gauss_loglik_trace_oracle_sql(model: GaussianHMM, n_iters: int = 2) -> str:
    """ANSI-SQL (DuckDB) oracle for :func:`ghmm_loglik_trace`: the shared
    chained-lap CTE prefix already carries the sequentially-accumulated
    ``ll`` column (ln(s) at t=0, then a.ll + ln(ns) — the exact
    gauss_score_oracle_sql accumulation order forward_backward_gauss
    uses), so each lap's per-sequence loglik is one join against lens."""
    union = "\nUNION ALL\n".join(
        f"SELECT {k} AS iter, a.user_id AS seq_id, round(a.ll, 6) AS loglik\n"
        f"FROM alpha{k} a JOIN lens l ON l.user_id = a.user_id AND a.t = l.t_len - 1"
        for k in range(1, n_iters + 1)
    )
    return _gauss_trace_ctes(model, n_iters) + f"\n{union}\n"


def _gauss_trace_ctes(model: GaussianHMM, n_iters: int = 2) -> str:
    """Shared WITH-prefix for the chained-lap oracles (gauss_trace_oracle_sql
    and gauss_loglik_trace_oracle_sql): per lap k, alpha{k}/beta{k}
    recursions (alpha carrying the sequential ll accumulator), gamma/xi
    frames, the m{k} rounded re-estimate, and (for k>1) the mw{k-1} pivot
    feeding lap k's model. Ends WITHOUT a trailing comma — append the
    consuming final SELECT after a newline."""
    from baum_welch_spark.hmm.decode import _lit

    if n_iters < 1:
        raise ValueError(f"n_iters must be >= 1, got {n_iters}")
    model = model.validate()
    N = model.pi.shape[0]
    j1 = range(1, N + 1)
    two_pi = _lit(2.0 * np.pi)

    sql = f"""
WITH coded AS MATERIALIZED ({_GCODED_SQL}),
lens AS MATERIALIZED (SELECT user_id, count(*) AS t_len FROM coded GROUP BY user_id),
"""

    for k in range(1, n_iters + 1):
        p = k - 1
        if k == 1:
            # literal-model lap
            def pi_e(j):
                return _lit(model.pi[j - 1])

            def a_e(i, j):
                return _lit(model.A[i - 1][j - 1])

            def emis(j, xref):
                return f"exp({_logb_expr(model, j - 1, xref)})"

            mjoin = ""
        else:
            def pi_e(j):
                return f"m.pi{j}"

            def a_e(i, j):
                return f"m.a{i}_{j}"

            def emis(j, xref):
                return (
                    f"exp(m.c1_{j} - ({xref} - m.mu{j}) * ({xref} - m.mu{j})"
                    f" * m.c2_{j})"
                )

            mjoin = f"\n    CROSS JOIN mw{p} m"
            pivot_pi = ",\n    ".join(
                f"coalesce(max(CASE WHEN kind = '{KIND_INITIAL}' AND j = {j - 1} THEN val END), 0.0) AS pi{j}"
                for j in j1
            )
            pivot_a = ",\n    ".join(
                f"coalesce(max(CASE WHEN kind = '{KIND_TRANSITION}' AND i = {i - 1} AND j = {j - 1} THEN val END), 0.0) AS a{i}_{j}"
                for i in j1
                for j in j1
            )
            pivot_muvar = ",\n    ".join(
                f"coalesce(max(CASE WHEN kind = 'mu' AND i = {j - 1} THEN val END), 0.0) AS mu{j},\n"
                f"    coalesce(max(CASE WHEN kind = 'var' AND i = {j - 1} THEN val END), 0.0) AS var{j},\n"
                f"    ({_lit(-0.5)} * ln({two_pi} * var{j})) AS c1_{j},\n"
                f"    ({_lit(1.0)} / ({_lit(2.0)} * var{j})) AS c2_{j}"
                for j in j1
            )
            sql += f"""
mw{p} AS MATERIALIZED (
  SELECT
    {pivot_pi},
    {pivot_a},
    {pivot_muvar}
  FROM m{p}
),
"""
        base_u = ",\n           ".join(
            f"{pi_e(j)} * {emis(j, 'c.x')} AS u{j}" for j in j1
        )
        step_u = ",\n           ".join(
            "(" + " + ".join(f"a.p{i} * {a_e(i, j)}" for i in j1) + f") * {emis(j, 'c.x')} AS nu{j}"
            for j in j1
        )
        usum = " + ".join(f"u{j}" for j in j1)
        nusum = " + ".join(f"nu{j}" for j in j1)
        norm = ", ".join(f"u{j} / s AS p{j}" for j in j1)
        nnorm = ", ".join(f"nu{j} / ns AS np{j}" for j in j1)
        base_b = ", ".join(f"{_lit(1.0)} AS b{j}" for j in j1)
        step_b = ",\n           ".join(
            "("
            + " + ".join(f"{a_e(i, j)} * {emis(j, 'c.x')} * b.b{j}" for j in j1)
            + f") / a.s AS nb{i}"
            for i in j1
        )
        gcols = ",\n         ".join(f"al.p{j} * bt.b{j} AS g{j}" for j in j1)
        xcols = ",\n         ".join(
            f"al.p{i} * {a_e(i, j)} * {emis(j, 'c.x')} * bt.b{j} / a2.s AS x{i}_{j}"
            for i in j1
            for j in j1
        )
        init = "\n  UNION ALL\n".join(
            f"  SELECT '{KIND_INITIAL}' AS kind, 0 AS i, {j - 1} AS j, sum(g{j}) AS weight FROM g{k} WHERE t = 0 HAVING sum(g{j}) > 0"
            for j in j1
        )
        trans = "\n  UNION ALL\n".join(
            f"  SELECT '{KIND_TRANSITION}', {i - 1}, {j - 1}, sum(x{i}_{j}) FROM xi{k} HAVING sum(x{i}_{j}) > 0"
            for i in j1
            for j in j1
        )
        moments = "\n  UNION ALL\n".join(
            f"  SELECT {j - 1} AS i, sum(g.g{j}) AS m0, sum(g.g{j} * c.x) AS m1,"
            f" sum(g.g{j} * c.x * c.x) AS m2"
            f" FROM g{k} g JOIN coded c ON c.user_id = g.user_id AND c.t = g.t"
            for j in j1
        )
        xjoin = f"\n  CROSS JOIN mw{p} m" if k > 1 else ""
        sql += f"""
alpha{k} AS MATERIALIZED (
  WITH RECURSIVE alpha{k}_r AS (
    SELECT c.user_id, 0 AS t,
           {base_u},
           ({usum}) AS s, ln(s) AS ll, {norm}
    FROM coded c{mjoin} WHERE c.t = 0
    UNION ALL
    SELECT a.user_id, a.t + 1,
           {step_u},
           ({nusum}) AS ns, a.ll + ln(ns) AS nll, {nnorm}
    FROM alpha{k}_r a
    JOIN coded c ON c.user_id = a.user_id AND c.t = a.t + 1{mjoin}
  ) SELECT * FROM alpha{k}_r
),
beta{k} AS MATERIALIZED (
  WITH RECURSIVE beta{k}_r AS (
    SELECT l.user_id, l.t_len - 1 AS t, {base_b}
    FROM lens l
    UNION ALL
    SELECT b.user_id, b.t - 1,
           {step_b}
    FROM beta{k}_r b
    JOIN coded c ON c.user_id = b.user_id AND c.t = b.t
    JOIN alpha{k} a ON a.user_id = b.user_id AND a.t = b.t{mjoin}
    WHERE b.t > 0
  ) SELECT * FROM beta{k}_r
),
g{k} AS MATERIALIZED (
  SELECT al.user_id, al.t,
         {gcols}
  FROM alpha{k} al JOIN beta{k} bt ON bt.user_id = al.user_id AND bt.t = al.t
),
xi{k} AS MATERIALIZED (
  SELECT al.user_id, al.t,
         {xcols}
  FROM alpha{k} al
  JOIN alpha{k} a2 ON a2.user_id = al.user_id AND a2.t = al.t + 1
  JOIN coded c ON c.user_id = al.user_id AND c.t = al.t + 1
  JOIN beta{k} bt ON bt.user_id = al.user_id AND bt.t = al.t + 1{xjoin}
),
raw{k} AS (
{init}
  UNION ALL
{trans}
),
mo{k} AS (
{moments}
),
m{k} AS MATERIALIZED (
SELECT kind, i::INTEGER AS i, j::INTEGER AS j,
       round(weight / sum(weight) OVER (PARTITION BY kind, i), 6) AS val
FROM raw{k}
UNION ALL
SELECT 'mu', i::INTEGER, 0, round(m1 / m0, 6) FROM mo{k}
UNION ALL
SELECT 'var', i::INTEGER, 0,
       round(greatest(m2 / m0 - (m1 / m0) * (m1 / m0), {_lit(VAR_FLOOR)}), 6)
FROM mo{k}
),
"""

    return sql.rstrip().rstrip(",")
