"""Model-application operators: Viterbi decoding, posterior scoring, top-k.

The reference's downstream story (decoding/evaluation lives in Mahout's
sequential HmmEvaluator, outside the reference repo — SURVEY §3.3); here
they are first-class distributed operators over the ``sequences`` corpus:

  * viterbi_decode    — most likely hidden path per sequence (log-space DP)
  * posterior_decode  — per-step most-likely state (argmax gamma_t) — the
                        cheap alternative to Viterbi when per-step marginals,
                        not the jointly-best path, are wanted
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


def posterior_decode(spark: SparkSession, sequences: DataFrame, model: HMM) -> DataFrame:
    """Posterior (gamma) decoding: per step t, the state maximizing the
    marginal P(s_t = q | O, λ) = gamma_t(q) from the scaled forward-backward
    kernel — first-max tiebreak (np.argmax), matching the SQL oracle's CASE.

    Unlike Viterbi this picks each step independently (the resulting path
    can even have zero joint probability); it is the right decode when
    per-step accuracy is the loss. Same scale shape as viterbi_decode: the
    model broadcasts, the map is narrow, no shuffle.

    Output: (seq_id, path_str) with path_str the comma-joined argmax states.
    """
    bc = spark.sparkContext.broadcast((model.pi, model.A, model.B))

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from baum_welch_spark.hmm.kernel import forward_backward

        pi, A, B = bc.value
        for pdf in batches:
            ids, paths = [], []
            for seq_id, obs in zip(pdf["seq_id"], pdf["obs"]):
                if obs is None or len(obs) == 0:
                    continue
                alpha, beta, _, _ = forward_backward(
                    pi, A, B, np.asarray(obs, dtype=np.int64)
                )
                states = np.argmax(alpha * beta, axis=1)
                ids.append(seq_id)
                paths.append(",".join(str(int(s)) for s in states))
            yield pd.DataFrame({"seq_id": ids, "path_str": paths})

    return sequences.mapInPandas(decode, schema="seq_id bigint, path_str string")


def score_sequences_face(spark: SparkSession, sequences: DataFrame, model: HMM) -> DataFrame:
    """Driver-contract face of score_sequences: log-likelihoods rounded to a
    stable precision so the DuckDB recursive-CTE oracle (score_oracle_sql)
    hashes identically — the two sides accumulate the same scaled-forward
    recursion in different summation orders, equal to ~1e-12 but not bitwise."""
    scored = score_sequences(spark, sequences, model)
    return scored.select(
        "seq_id",
        "t_len",
        F.round("loglik", 6).alias("loglik"),
        F.round("avg_loglik", 6).alias("avg_loglik"),
    )


# ---------------------------------------------------------------------------
# DuckDB-exact oracles: the forward and Viterbi DPs as recursive CTEs over the
# coded events stream, with the model embedded as full-precision literals.
# ---------------------------------------------------------------------------

_CODED_SQL = """
  SELECT user_id,
         (dense_rank() OVER (ORDER BY event_type) - 1) AS sym,
         (row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1) AS t
  FROM events
"""


def _lit(x: float) -> str:
    """Full-precision double literal in scientific notation: DuckDB lexes
    e-notation as DOUBLE (plain decimals become DECIMAL and break list-literal
    type inference), and 17 significant digits round-trip IEEE doubles, so the
    engine parses the exact bits NumPy computed.

    log-space model rows can contain -inf (log of a zero probability, e.g. a
    transition EM collapsed to 0); the bare token '-inf' is not valid DuckDB
    SQL, so non-finite values emit the typed '-infinity' cast instead."""
    v = float(x)
    if v == float("-inf"):
        return "CAST('-infinity' AS DOUBLE)"
    if v == float("inf"):
        return "CAST('infinity' AS DOUBLE)"
    if v != v:  # NaN (degenerate 0/0 normalization row) — bare 'nan' is
        return "CAST('nan' AS DOUBLE)"  # not a DuckDB literal either
    return f"{v:.17e}"


def _blist(row) -> str:
    """A model row as a DuckDB list literal, indexed by ``[sym + 1]``."""
    return "[" + ", ".join(_lit(v) for v in row) + "]"


def score_oracle_sql(model: HMM) -> str:
    """ANSI-SQL (DuckDB) oracle for score_sequences_face: the scaled forward
    recursion (kernel.forward_backward, reference M2) as a recursive CTE.

    Per step the unnormalized alphas u_j, their sum s, the running
    log-likelihood ll += ln(s), and the normalized alphas p_j are carried as
    plain columns (lateral aliases). Values agree with the NumPy kernel to
    ~1e-12; both sides round to 6 decimals."""
    N = model.pi.shape[0]
    pi, A, B = model.pi, model.A, model.B
    j1 = range(1, N + 1)
    base_u = ",\n         ".join(
        f"{_lit(pi[j - 1])} * ({_blist(B[j - 1])})[c.sym + 1] AS u{j}" for j in j1
    )
    # recursive member: FRESH alias names (nu/ns/...) — unqualified u1/s/ll
    # would bind to the working table's same-named columns, not the lateral
    # aliases, silently freezing the recursion. Output names are positional.
    step_u = ",\n         ".join(
        "("
        + " + ".join(f"a.p{i} * {_lit(A[i - 1][j - 1])}" for i in j1)
        + f") * ({_blist(B[j - 1])})[c.sym + 1] AS nu{j}"
        for j in j1
    )
    usum = " + ".join(f"u{j}" for j in j1)
    nusum = " + ".join(f"nu{j}" for j in j1)
    norm = ", ".join(f"u{j} / s AS p{j}" for j in j1)
    nnorm = ", ".join(f"nu{j} / ns AS np{j}" for j in j1)
    # MATERIALIZED on every CTE a recursion references: DuckDB (1.0)
    # otherwise INLINES the referenced CTE into each recursive iteration —
    # coded's window functions would re-run per step, and in the two-CTE
    # oracles below a whole upstream RECURSION re-runs per step of the
    # downstream one (quadratic; state_occupancy took 25+ min at sf0.01
    # before this). The inner WITH RECURSIVE inside a materialized CTE
    # evaluates once; values are bit-identical either way.
    return f"""
WITH coded AS MATERIALIZED ({_CODED_SQL}),
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


def _argmax_case(cand: list[str]) -> str:
    """First-max-tiebreak argmax over SQL expressions, mirroring np.argmax."""
    if len(cand) == 1:
        return "0"  # a zero-WHEN "CASE ELSE 0 END" is a parse error
    whens = []
    for k in range(len(cand) - 1):
        cond = " AND ".join(f"{cand[k]} >= {cand[m]}" for m in range(k + 1, len(cand)))
        whens.append(f"WHEN {cond} THEN {k}")
    return "CASE " + " ".join(whens) + f" ELSE {len(cand) - 1} END"


def posterior_oracle_sql(model: HMM) -> str:
    """ANSI-SQL (DuckDB) oracle for posterior_decode: the scaled forward
    recursion (normalized alphas, as in score_oracle_sql) plus the scaled
    backward recursion as a second recursive CTE running t_len-1 -> 0, then
    per-step argmax of gamma_j = p_j * b_j.

    The two engines accumulate the recursions in different float-summation
    orders (agreeing to ~1e-12); argmax is stable because distinct gammas
    under a generic random model are separated by far more than that — no
    rounding boundary is involved, unlike value-emitting faces."""
    N = model.pi.shape[0]
    j1 = range(1, N + 1)
    gamma_argmax = _argmax_case([f"al.p{j} * bt.b{j}" for j in j1])
    return _fb_ctes(model) + f"""
g AS (
  SELECT al.user_id, al.t, ({gamma_argmax}) AS state
  FROM alpha al JOIN beta bt ON bt.user_id = al.user_id AND bt.t = al.t
)
SELECT user_id AS seq_id,
       string_agg(state::VARCHAR, ',' ORDER BY t) AS path_str
FROM g GROUP BY user_id
"""


def _fb_ctes(model: HMM) -> str:
    """Shared WITH-prefix for γ-based oracles: coded/lens/alpha/beta CTEs
    (scaled forward + scaled backward recursions with the model embedded as
    full-precision literals). Ends with a trailing comma — append the
    consuming CTE/SELECT."""
    N = model.pi.shape[0]
    pi, A, B = model.pi, model.A, model.B
    j1 = range(1, N + 1)
    base_u = ",\n         ".join(
        f"{_lit(pi[j - 1])} * ({_blist(B[j - 1])})[c.sym + 1] AS u{j}" for j in j1
    )
    step_u = ",\n         ".join(
        "("
        + " + ".join(f"a.p{i} * {_lit(A[i - 1][j - 1])}" for i in j1)
        + f") * ({_blist(B[j - 1])})[c.sym + 1] AS nu{j}"
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
            f"{_lit(A[i - 1][j - 1])} * ({_blist(B[j - 1])})[c.sym + 1] * b.b{j}"
            for j in j1
        )
        + f") / a.s AS nb{i}"
        for i in j1
    )
    # MATERIALIZED is load-bearing: without it DuckDB inlines alpha (a full
    # recursion) into EVERY step of beta's recursion — see score_oracle_sql
    return f"""
WITH coded AS MATERIALIZED ({_CODED_SQL}),
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


def state_occupancy(spark: SparkSession, sequences: DataFrame, model: HMM) -> DataFrame:
    """Expected state-occupancy counts: per (seq_id, state), the expected
    number of steps spent in that state, Σ_t γ_t(state) with γ normalized
    per step — Rabiner's occupancy statistic (1989 eq. 27 numerator), the
    soft version of counting a decoded path's states. Same scale shape as
    the decodes: model broadcast, narrow map, no shuffle; output is
    N rows per sequence.
    """
    bc = spark.sparkContext.broadcast((model.pi, model.A, model.B))

    def occupancy(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from baum_welch_spark.hmm.kernel import forward_backward

        pi, A, B = bc.value
        n = pi.shape[0]
        for pdf in batches:
            ids, states, occs = [], [], []
            for seq_id, obs in zip(pdf["seq_id"], pdf["obs"]):
                if obs is None or len(obs) == 0:
                    continue
                alpha, beta, _, _ = forward_backward(
                    pi, A, B, np.asarray(obs, dtype=np.int64)
                )
                g = alpha * beta
                g = g / g.sum(axis=1, keepdims=True)
                occ = g.sum(axis=0)
                ids.extend([seq_id] * n)
                states.extend(range(n))
                # round half-AWAY-from-zero to match DuckDB's round():
                # np.round is half-even, so an occupancy landing exactly on
                # an x.xxxxxx5 boundary would round differently per engine
                # and flip the byte-exact driver hash. Occupancy is >= 0,
                # so floor(x*1e6 + 0.5) is exactly DuckDB's convention.
                occs.extend(np.floor(occ * 1e6 + 0.5) / 1e6)
            yield pd.DataFrame({"seq_id": ids, "state": states, "occupancy": occs})

    return sequences.mapInPandas(
        occupancy, schema="seq_id bigint, state int, occupancy double"
    )


def occupancy_oracle_sql(model: HMM) -> str:
    """ANSI-SQL (DuckDB) oracle for state_occupancy: the shared scaled
    forward/backward CTEs, per-step normalized γ, summed over t per state
    (one UNION ALL branch per state — N is model-sized)."""
    N = model.pi.shape[0]
    j1 = range(1, N + 1)
    gsum = " + ".join(f"al.p{j} * bt.b{j}" for j in j1)
    gcols = ",\n         ".join(
        f"(al.p{j} * bt.b{j}) / ({gsum}) AS g{j}" for j in j1
    )
    branches = "\nUNION ALL\n".join(
        f"SELECT user_id AS seq_id, {j - 1} AS state, round(sum(g{j}), 6) AS occupancy FROM g GROUP BY user_id"
        for j in j1
    )
    return (
        _fb_ctes(model)
        + f"""
g AS MATERIALIZED (
  SELECT al.user_id, al.t,
         {gcols}
  FROM alpha al JOIN beta bt ON bt.user_id = al.user_id AND bt.t = al.t
)
{branches}
"""
    )


def viterbi_ctes(model: HMM) -> str:
    """Shared CTE block (``coded``, ``lens``, ``delta``, ``back``) computing
    per-(seq, t) Viterbi states — the DP core of both the decode oracle and
    the hard-EM re-estimation oracle (hmm.viterbi_train). Returned WITHOUT
    the leading ``WITH`` so callers can append their own CTEs.

    The log-model entries are embedded as repr() literals of the exact NumPy
    doubles the Spark operator broadcasts, and every DP cell is the same
    two-operand IEEE sum, so the deltas are BITWISE equal to _viterbi_one's —
    argmax ties (first-max, matching np.argmax) resolve identically and
    paths match exactly, not just approximately."""
    N = model.pi.shape[0]
    with np.errstate(divide="ignore"):
        lpi, lA, lB = np.log(model.pi), np.log(model.A), np.log(model.B)
    j1 = range(1, N + 1)
    base_d = ",\n         ".join(
        f"{_lit(lpi[j - 1])} + ({_blist(lB[j - 1])})[c.sym + 1] AS d{j}" for j in j1
    )
    step_d = ",\n         ".join(
        "greatest("
        + ", ".join(f"p.d{i} + {_lit(lA[i - 1][j - 1])}" for i in j1)
        + f") + ({_blist(lB[j - 1])})[c.sym + 1] AS d{j}"
        for j in j1
    )

    final_argmax = _argmax_case([f"d.d{j}" for j in j1])
    # backtrack candidates: c_i = delta[t-1][i] + logA[i][state], with the
    # state-dependent logA picked by a CASE on the current row's state
    back_cand = [
        f"(d.d{i} + CASE b.state "
        + " ".join(f"WHEN {j - 1} THEN {_lit(lA[i - 1][j - 1])}" for j in j1)
        + " END)"
        for i in j1
    ]
    back_argmax = _argmax_case(back_cand)
    dmax = ", ".join(f"d.d{j}" for j in j1)
    # MATERIALIZED is load-bearing: without it DuckDB inlines delta (a full
    # recursion) into EVERY step of back's recursion — see score_oracle_sql
    return f"""coded AS MATERIALIZED ({_CODED_SQL}),
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
)"""


def viterbi_oracle_sql(model: HMM) -> str:
    """ANSI-SQL (DuckDB) oracle for viterbi_decode_face — see viterbi_ctes."""
    return f"""
WITH {viterbi_ctes(model)}
SELECT b.user_id AS seq_id, round(b.loglik, 6) AS loglik, b.path AS path_str
FROM back b WHERE b.t = 0
"""


def viterbi_topk_oracle_sql(model: HMM, k: int = 3) -> str:
    """ANSI-SQL (DuckDB) oracle for viterbi_topk_face (r11): the parallel
    list-Viterbi DP as a recursive CTE whose state is the full (N, k) score
    block PLUS each lane's path string — a forward-carried path replaces the
    backpointer tensor, so no backward recursion is needed.

    Per step and per destination state j, the N·k candidates are packed as
    ``struct(ns := -(d + logA), o := flat_ordinal, p := path)`` and
    ``list_sort``-ed: ascending ns is descending score with -inf lanes
    (+inf after negation) sorted last, exactly like the kernel's
    ``argsort(-flat, stable)``, and the flat ordinal ``(i-1)*k + (rr-1)``
    is the kernel's i-major/r-minor ravel index, so score ties resolve to
    the identical lane. Every lane score is the same two-operand IEEE sum
    as the NumPy kernel's ((d + logA) + logB, with literals emitted by
    :func:`_lit` at full precision), so scores are BITWISE equal and the
    sort orders — hence the paths — match exactly, not approximately.
    Final ranking sorts the (N, k) block by the same (−score, j-major
    ordinal) rule; only finite lanes emit (k rows per sequence whenever
    N^T >= k). Cost: T steps × N list_sorts of N·k structs per sequence —
    model-sized, fine at oracle scale (k=3, N=4 → 12-lane state)."""
    N = model.pi.shape[0]
    with np.errstate(divide="ignore"):
        lpi, lA, lB = np.log(model.pi), np.log(model.A), np.log(model.B)
    j1 = range(1, N + 1)
    r1 = range(1, k + 1)
    ninf = "CAST('-infinity' AS DOUBLE)"

    base_cols = []
    for j in j1:
        base_cols.append(
            f"{_lit(lpi[j - 1])} + ({_blist(lB[j - 1])})[c.sym + 1] AS d{j}_1"
        )
        base_cols.append(f"'{j - 1}' AS p{j}_1")
        for r in list(r1)[1:]:
            base_cols.append(f"{ninf} AS d{j}_{r}")
            base_cols.append(f"'' AS p{j}_{r}")

    sort_cols = []
    step_cols = []
    for j in j1:
        cands = ", ".join(
            f"struct_pack(ns := -(a.d{i}_{rr} + {_lit(lA[i - 1][j - 1])}), "
            f"o := {(i - 1) * k + (rr - 1)}, p := a.p{i}_{rr})"
            for i in j1
            for rr in r1
        )
        sort_cols.append(f"list_sort([{cands}]) AS sl{j}")
        for r in r1:
            step_cols.append(
                f"-(q.sl{j}[{r}].ns) + ({_blist(lB[j - 1])})[q.sym + 1] AS nd{j}_{r}"
            )
            step_cols.append(f"q.sl{j}[{r}].p || ',' || '{j - 1}' AS np{j}_{r}")

    fin_cands = ", ".join(
        f"struct_pack(ns := -d.d{j}_{r}, o := {(j - 1) * k + (r - 1)}, p := d.p{j}_{r})"
        for j in j1
        for r in r1
    )
    rank_selects = "\nUNION ALL\n".join(
        f"SELECT user_id AS seq_id, {m} AS rank, round(-(sl[{m + 1}].ns), 6) AS loglik, "
        f"sl[{m + 1}].p AS path_str FROM fin WHERE sl[{m + 1}].ns < CAST('infinity' AS DOUBLE)"
        for m in range(k)
    )
    base = ",\n           ".join(base_cols)
    sorts = ",\n             ".join(sort_cols)
    step = ",\n           ".join(step_cols)
    # the recursive member computes the per-state sorted candidate lists in
    # an inner derived table (one reference to dp_r) so the CTE's output
    # schema stays exactly the (d, p) state block — sl{j} as lateral
    # aliases in the outer select would become extra output columns and
    # break positional matching with the base member
    return f"""
WITH coded AS MATERIALIZED ({_CODED_SQL}),
lens AS MATERIALIZED (SELECT user_id, count(*) AS t_len FROM coded GROUP BY user_id),
dp AS MATERIALIZED (
  WITH RECURSIVE dp_r AS (
    SELECT c.user_id, 0 AS t,
           {base}
    FROM coded c WHERE c.t = 0
    UNION ALL
    SELECT q.user_id, q.t + 1,
           {step}
    FROM (
      SELECT a.*, c.sym,
             {sorts}
      FROM dp_r a JOIN coded c ON c.user_id = a.user_id AND c.t = a.t + 1
    ) q
  ) SELECT * FROM dp_r
),
fin AS (
  SELECT d.user_id, list_sort([{fin_cands}]) AS sl
  FROM dp d JOIN lens l ON l.user_id = d.user_id AND d.t = l.t_len - 1
)
{rank_selects}
"""


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


TOPK_SCHEMA = "seq_id bigint, rank int, loglik double, path array<int>"


def _viterbi_topk_one(log_pi, log_A, log_B, obs, k):
    """Parallel list-Viterbi (the serial list Viterbi algorithm of
    Seshadri & Sundberg 1994, rank-merged per state): per state keep the
    top-k partial path scores; a candidate at step t is (prev_state,
    prev_rank), merged across N*k entries per state. Backpointer chains
    are structurally distinct, so the k final paths are distinct without
    any dedup. Returns [(loglik, path)] best-first, len <= min(k, N^T)."""
    T = obs.shape[0]
    N = log_pi.shape[0]
    # delta: (N, k) partial scores, -inf padded; bp: (T, N, k, 2)
    delta = np.full((N, k), -np.inf)
    delta[:, 0] = log_pi + log_B[:, obs[0]]
    bp = np.zeros((T, N, k, 2), dtype=np.int32)
    for t in range(1, T):
        new_delta = np.full((N, k), -np.inf)
        for j in range(N):
            cand = delta + log_A[:, j][:, None]  # (N, k)
            flat = cand.ravel()
            top = np.argsort(-flat, kind="stable")[:k]
            keep = flat[top] > -np.inf
            top = top[keep]
            new_delta[j, : len(top)] = flat[top] + log_B[j, obs[t]]
            bp[t, j, : len(top), 0] = top // k  # prev state
            bp[t, j, : len(top), 1] = top % k  # prev rank
        delta = new_delta
    flat = delta.ravel()
    order = np.argsort(-flat, kind="stable")
    order = order[flat[order] > -np.inf][:k]
    out = []
    for idx in order:
        j, r = int(idx // k), int(idx % k)
        path = np.empty(T, dtype=np.int32)
        path[T - 1] = j
        for t in range(T - 1, 0, -1):
            j, r = int(bp[t, j, r, 0]), int(bp[t, j, r, 1])
            path[t - 1] = j
        out.append((float(flat[idx]), path))
    return out


def _viterbi_topk_batch_core(log_pi, log_A, log_B, obs_list, k):
    """One padded (S, N, k) list-Viterbi DP for a batch of sequences whose
    lengths are within one octave (see _viterbi_topk_batch). Bitwise-equal
    to looping :func:`_viterbi_topk_one`: every DP cell is the same
    two-operand IEEE add in the same order, the candidate flattening is the
    same i-major/r-minor ravel, and the stable argsort resolves ties by the
    same flat ordinal — asserted exactly in tests/test_decode.py.

    Padding semantics: past a sequence's end the (N, k) score block is
    carried forward unchanged, so the final block equals the block at the
    sequence's own last step; backpointers written at padded steps are
    never read (backtrack starts at each sequence's own T-1).
    Returns a list aligned with obs_list of [(loglik, path)] best-first."""
    S = len(obs_list)
    N = log_pi.shape[0]
    lens = np.array([len(o) for o in obs_list], dtype=np.int64)
    Tmax = int(lens.max())
    obs_pad = np.zeros((Tmax, S), dtype=np.int64)
    for s_i, o in enumerate(obs_list):
        obs_pad[: len(o), s_i] = o
    valid = np.arange(Tmax)[:, None] < lens[None, :]  # (T, S)

    delta = np.full((S, N, k), -np.inf)
    delta[:, :, 0] = log_pi[None, :] + log_B[:, obs_pad[0]].T
    bp = np.zeros((Tmax, S, N, k, 2), dtype=np.int32)
    for t in range(1, Tmax):
        # (S, N_prev, N_cur, k) -> (S, N_cur, N_prev*k): i-major/r-minor,
        # the exact ravel order of the serial kernel's per-j cand.ravel()
        cand = delta[:, :, None, :] + log_A[None, :, :, None]
        flat = np.ascontiguousarray(cand.transpose(0, 2, 1, 3)).reshape(S, N, N * k)
        top = np.argsort(-flat, axis=-1, kind="stable")[:, :, :k]  # (S, N, k)
        vals = np.take_along_axis(flat, top, axis=-1)
        emit = log_B[:, obs_pad[t]].T  # (S, N)
        nd = np.where(vals > -np.inf, vals + emit[:, :, None], -np.inf)
        bp[t, :, :, :, 0] = top // k
        bp[t, :, :, :, 1] = top % k
        delta = np.where(valid[t][:, None, None], nd, delta)

    out_all = []
    for s in range(S):
        T = int(lens[s])
        flat = delta[s].ravel()
        order = np.argsort(-flat, kind="stable")
        order = order[flat[order] > -np.inf][:k]
        out = []
        for idx in order:
            j, r = int(idx // k), int(idx % k)
            path = np.empty(T, dtype=np.int32)
            path[T - 1] = j
            for t in range(T - 1, 0, -1):
                j, r = int(bp[t, s, j, r, 0]), int(bp[t, s, j, r, 1])
                path[t - 1] = j
            out.append((float(flat[idx]), path))
        out_all.append(out)
    return out_all


#: max Tmax × S × N × k DP cells per _viterbi_topk_batch_core call — the
#: backpointer tensor is (Tmax, S, N, k, 2) int32, so this bounds it at
#: ~134 MB no matter how many long sequences share an Arrow batch (the
#: batched E-step streams its alpha the same way length-bucketing bounds
#: its padding; here the bp tensor must persist until backtrack, so the
#: bound is an explicit sequence-axis chunk instead)
_TOPK_DP_BUDGET = 1 << 24


def _viterbi_topk_batch(log_pi, log_A, log_B, obs_list, k):
    """Length-skew-hardened batched list-Viterbi (VERDICT-r10 #2): octave
    length-bucketing (kernel._length_buckets) bounds padded DP cost at 2×
    the true work exactly as the batched E-step does, and within a bucket
    the DP vectorizes across the sequence axis — the per-sequence Python
    dispatch that made this the slowest decode face is gone. Buckets are
    further chunked on the sequence axis so the per-call backpointer
    tensor stays under ``_TOPK_DP_BUDGET`` cells (each sequence's DP is
    independent, so chunking is bitwise-invisible). Returns a list
    aligned with obs_list."""
    from baum_welch_spark.hmm.kernel import _length_buckets

    if not obs_list:
        return []
    N = log_pi.shape[0]
    results: list = [None] * len(obs_list)
    for idxs in _length_buckets([len(o) for o in obs_list]):
        t_max = max(len(obs_list[i]) for i in idxs)
        cap = max(1, _TOPK_DP_BUDGET // max(1, t_max * N * k))
        for lo in range(0, len(idxs), cap):
            sub = idxs[lo : lo + cap]
            outs = _viterbi_topk_batch_core(
                log_pi, log_A, log_B, [obs_list[i] for i in sub], k
            )
            for i, out in zip(sub, outs):
                results[i] = out
    return results


def viterbi_topk(
    spark: SparkSession, sequences: DataFrame, model: HMM, k: int = 3
) -> DataFrame:
    """N-best decoding: the ``k`` jointly most likely hidden paths per
    sequence with their joint log-probabilities — what a rescoring pipeline
    consumes (second-pass ranking over decode hypotheses) and what
    separates a dominant MAP path from a near-tie that posterior_entropy
    flags. Same scale shape as viterbi_decode: broadcast model, narrow
    Arrow map, no shuffle; per-sequence cost O(T N^2 k log k), vectorized
    across the Arrow batch's sequence axis with octave length-bucketing
    (same skew bound as the batched E-step)."""
    model = model.validate()
    with np.errstate(divide="ignore"):
        bc = spark.sparkContext.broadcast(
            (np.log(model.pi), np.log(model.A), np.log(model.B))
        )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        log_pi, log_A, log_B = bc.value
        for pdf in batches:
            ids, obs_list = [], []
            for seq_id, obs in zip(pdf["seq_id"], pdf["obs"]):
                if obs is None or len(obs) == 0:
                    continue
                ids.append(int(seq_id))
                obs_list.append(np.asarray(obs, dtype=np.int64))
            out_ids, ranks, lls, paths = [], [], [], []
            for seq_id, hyp in zip(
                ids, _viterbi_topk_batch(log_pi, log_A, log_B, obs_list, k)
            ):
                for r, (ll, p) in enumerate(hyp):
                    out_ids.append(seq_id)
                    ranks.append(r)
                    lls.append(ll)
                    paths.append(list(p))
            yield pd.DataFrame(
                {"seq_id": out_ids, "rank": ranks, "loglik": lls, "path": paths}
            )

    return sequences.mapInPandas(decode, schema=TOPK_SCHEMA)


def viterbi_topk_face(
    spark: SparkSession, sequences: DataFrame, model: HMM, k: int = 3
) -> DataFrame:
    """Scalar driver-contract face of viterbi_topk: the ``path array<int>``
    column is unhashable in the driver's canonicalizer (it sort_values over
    every column), so project it to a comma-joined ``path_str`` — the same
    pattern viterbi_decode_face uses — and round the joint log-likelihood
    to a stable precision."""
    hyp = viterbi_topk(spark, sequences, model, k=k)
    return hyp.select(
        "seq_id",
        "rank",
        F.round("loglik", 6).alias("loglik"),
        F.array_join(F.transform("path", lambda x: x.cast("string")), ",").alias(
            "path_str"
        ),
    )
