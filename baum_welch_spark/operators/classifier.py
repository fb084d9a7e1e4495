"""Trainable document-quality classifier: distributed logistic regression
over cheap Catalyst text features — the "fasttext-style quality filter"
stage of an LLM data pipeline (train a small model on labeled slices, score
the whole corpus, keep the high-probability docs).

Scale posture (100 TB corpus):

- Features are shuffle-free codegen projections (same family as
  ``text.doc_quality``).
- Each training iteration is one ``mapInPandas`` pass that folds every
  Arrow batch into a single gradient + 5x5-Hessian partial (in-UDF combine —
  the E-step / k-means shape again): shuffle volume is
  O(partitions x (d+1)^2) per iteration, independent of corpus size.
- Newton/IRLS steps on the driver (the Hessian is model-sized), so the
  pass count is ~8 instead of gradient descent's 30+ — at 100 TB the
  number of passes over the cached features IS the training cost.
- The model (w, b) is a handful of floats on the driver; scoring broadcasts
  it back as literals inside a codegen sigmoid — no UDF in the scoring path.

Iterative training is not SQL-expressible, so the driver-contract face is
rows-only; correctness is pinned by property tests (loss monotonicity,
holdout accuracy over the majority baseline, sign sanity, partitioning
invariance at tolerance).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: feature names in model order (bias appended internally)
FEATURES = ["log_words", "mean_word_len", "stop_ratio", "digit_ratio"]

_STOP = ["the", "a", "of", "and", "to", "in", "is", "it", "for", "on"]


def doc_features(documents: DataFrame, label: Column | None = None) -> DataFrame:
    """Per-doc feature projection (shuffle-free codegen).

    ``label`` defaults to ``lang = 'en'`` — a deterministic target that
    exists at every sf; swap in a curated-quality label column in
    production.
    """
    from baum_welch_spark.functions.columns import words

    w = words("text")
    stop_arr = F.array(*[F.lit(s) for s in _STOP])
    n_words = F.size(w)
    n_stop = F.size(F.filter(w, lambda x: F.array_contains(stop_arr, x)))
    n_digit = F.length(F.regexp_replace("text", r"[^0-9]", ""))
    n_chars = F.length("text")
    y = (label if label is not None else (F.col("lang") == "en")).cast("double")
    # n_words >= 1 always (split of "" yields [""]), but n_chars can be 0:
    # guard the division or ANSI mode aborts the whole job on one empty doc
    digit_ratio = F.when(n_chars > 0, n_digit.cast("double") / n_chars).otherwise(0.0)
    return documents.select(
        "doc_id",
        F.log(n_words.cast("double") + 1.0).alias("log_words"),
        (n_chars.cast("double") / n_words).alias("mean_word_len"),
        (n_stop.cast("double") / n_words).alias("stop_ratio"),
        digit_ratio.alias("digit_ratio"),
        y.alias("y"),
    )


def fit_logreg(
    feats: DataFrame, lr: float = 1.0, n_iter: int = 8
) -> tuple[np.ndarray, list[float]]:
    """Full-batch NEWTON (IRLS) iterations on standardized features.

    With d+1 = 5 parameters the Hessian is 5x5, so each iteration folds the
    exact gradient AND Hessian into one in-UDF-combine pass and the driver
    takes a (ridge-damped) Newton step — quadratic convergence means ~8
    passes where plain gradient descent needed 30+. At 100 TB the pass
    count IS the cost (each is a full read of the cached training frame),
    so the optimizer choice is a scale decision, not a styling one.

    Returns (weights over FEATURES + [bias] folded back to raw-feature
    coefficients, loss trace). Standardization moments come from one
    combinable aggregate; each Newton step shuffles only
    O(partitions x (d+1)^2) partial rows. ``lr`` damps the Newton step
    (1.0 = full step).
    """
    from pyspark import StorageLevel

    d = len(FEATURES)
    # Persist the (features, label) projection ONCE: the corpus scan plus the
    # regex-heavy feature computation would otherwise re-run for the moment
    # aggregate and again for every GD iteration (n_iter full corpus reads at
    # 100 TB). Materialized by the stats action below, reused by every
    # gradient pass, released before returning (pattern of hmm/fit.py).
    src = feats.select(*FEATURES, "y").persist(StorageLevel.MEMORY_AND_DISK)
    try:
        return _fit_logreg_cached(src, d, lr, n_iter)
    finally:
        src.unpersist()


def _fit_logreg_cached(
    src: DataFrame, d: int, lr: float, n_iter: int
) -> tuple[np.ndarray, list[float]]:
    stats = src.agg(
        *[F.avg(c).alias(f"m_{c}") for c in FEATURES],
        *[F.stddev_pop(c).alias(f"s_{c}") for c in FEATURES],
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    if stats["n"] == 0:
        raise ValueError("fit_logreg: empty training set")
    mu = np.array([stats[f"m_{c}"] for c in FEATURES])
    sd = np.array([max(stats[f"s_{c}"], 1e-12) for c in FEATURES])
    n = float(stats["n"])

    sc = src.sparkSession.sparkContext
    D = d + 1
    w = np.zeros(D)
    trace: list[float] = []
    for _ in range(n_iter):
        bc = sc.broadcast((w, mu, sd))

        def newton_partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            wv, m, s = bc.value
            Dl = len(wv)
            g = np.zeros(Dl)
            H = np.zeros((Dl, Dl))
            loss = 0.0
            for pdf in batches:
                if not len(pdf):
                    continue
                X = (pdf[FEATURES].to_numpy(dtype=np.float64) - m) / s
                Xb = np.hstack([X, np.ones((len(X), 1))])
                yv = pdf["y"].to_numpy(dtype=np.float64)
                z = Xb @ wv
                p = 1.0 / (1.0 + np.exp(-z))
                g += Xb.T @ (p - yv)
                H += (Xb * (p * (1.0 - p))[:, None]).T @ Xb
                eps = 1e-12
                loss += float(-(yv * np.log(p + eps) + (1 - yv) * np.log(1 - p + eps)).sum())
            vec = np.concatenate([g, H.ravel(), [loss]])
            yield pd.DataFrame(
                {"i": np.arange(len(vec), dtype=np.int32), "v": vec}
            )

        agg = (
            src.mapInPandas(newton_partial, schema="i int, v double")
            .groupBy("i")
            .agg(F.sum("v").alias("v"))
            .collect()
        )
        bc.destroy()
        vec = np.zeros(D + D * D + 1)
        for r in agg:
            vec[r["i"]] = r["v"]
        g = vec[:D]
        H = vec[D : D + D * D].reshape(D, D)
        # ridge-damped Newton: the planted-separable case drives p -> 0/1 and
        # the Hessian toward singular; the tiny ridge keeps the solve stable
        # without biasing well-conditioned steps
        try:
            step = np.linalg.solve(H + 1e-8 * n * np.eye(D), g)
        except np.linalg.LinAlgError:
            step = g / n  # degenerate Hessian: fall back to a gradient step
        w = w - lr * step
        trace.append(vec[-1] / n)

    # fold standardization into raw-space coefficients: w_raw = w_std / sd,
    # b_raw = b - sum(w_std * mu / sd)
    w_raw = np.concatenate([w[:d] / sd, [w[d] - float((w[:d] * mu / sd).sum())]])
    return w_raw, trace


def quality_classifier_scores(
    documents: DataFrame, train_mod: int = 5, threshold: float = 0.5
) -> DataFrame:
    """Driver-contract face: train on the ``doc_id % train_mod != 0`` slice
    (deterministic split, like every sampler here), score ALL docs with the
    learned sigmoid as a pure codegen expression.

    Output: (doc_id, y, prob, pred) ordered by doc_id; prob rounded to 4 dp.
    """
    feats = doc_features(documents)
    train = feats.where(F.col("doc_id") % train_mod != 0)
    if train.isEmpty():  # empty corpus -> empty scores, not a driver crash
        return documents.sparkSession.createDataFrame(
            [], "doc_id long, y bigint, prob double, pred bigint"
        )
    w, _ = fit_logreg(train)
    z = F.lit(float(w[len(FEATURES)]))
    for i, c in enumerate(FEATURES):
        z = z + F.lit(float(w[i])) * F.col(c)
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return (
        feats.select(
            "doc_id",
            F.col("y").cast("bigint").alias("y"),
            F.round(prob, 4).alias("prob"),
            (prob >= threshold).cast("bigint").alias("pred"),
        )
        .orderBy("doc_id")
    )


def logreg_gd_parity_sql(
    dialect: str,
    iters: int = 3,
    lr: float = 0.5,
    feat_round: int = 9,
    prob_round: int = 12,
    step_round: int = 9,
) -> str:
    """Generate the SAME unrolled full-batch gradient-descent logistic
    regression for both engines — the trainer analogue of
    ``clustering.kmeans_parity_sql``, pinning the optimizer-step CLASS
    behind the rows-only ``quality_classifier`` face (whose driver-side
    5x5 Newton solve is not SQL-expressible) with a DuckDB-exact
    fixed-iteration twin.

    Model: p = sigmoid(z.w + b) over 4 standardized text features
    (log_words, mean_word_len, stop_ratio, vowel_ratio — digit/punct
    ratios are degenerate on the synthetic corpus), label y = (lang='en'),
    w0 = 0. Step: w -= lr * avg((p - y) * z). Each GD step is ONE
    map-side-combinable aggregate over the corpus — the same
    shuffle-O(d)-per-pass economics as the mapInPandas Newton trainer it
    pins, just expressed relationally.

    Why it can be exact, term by term:

    - features: projections whose only transcendental is ``ln`` — computed
      on identical inputs then rounded to ``feat_round`` (1e-9 against
      ~1-ulp libm divergence of ~1e-15 relative);
    - standardization: mean and ((avg(f*f) - avg(f)^2) population std
      rounded to ``feat_round`` — the rounding absorbs cross-engine
      aggregate summation order; z recomputed from ROUNDED stats is then
      identical on both engines;
    - sigmoid: the dot product is a left-associated chain on identical
      doubles (bitwise equal); ``exp`` may diverge by 1 ulp between libm
      and the JVM, absorbed by rounding p to ``prob_round``;
    - gradient: avg over identical (p - y) * z values — order absorbed by
      ``step_round``; the update is arithmetic on identical literals;
    - readout: coefficients + training accuracy (threshold comparisons on
      identical rounded p), rounded to 6 with ``+ 0.0`` signed-zero
      normalization.

    ``dialect``: 'spark' or 'duckdb' — the only splits are the tokenize /
    list-count idioms; every CTE from ``stats`` down is byte-identical.
    """
    stop_list = "'the', 'a', 'of', 'and', 'to', 'in', 'is', 'it', 'for', 'on'"
    if dialect == "spark":
        raw = f"""
  SELECT doc_id, text, lang, split(lower(text), ' ') AS ws FROM documents"""
        n_stop = f"size(filter(ws, w -> w IN ({stop_list})))"
        n_words = "size(ws)"
        n_vowel = "length(regexp_replace(lower(text), '[^aeiou]', ''))"
    elif dialect == "duckdb":
        raw = """
  SELECT doc_id, text, lang, string_split(lower(text), ' ') AS ws FROM documents"""
        n_stop = f"len(list_filter(ws, w -> w IN ({stop_list})))"
        n_words = "len(ws)"
        n_vowel = "length(regexp_replace(lower(text), '[^aeiou]', '', 'g'))"
    else:
        raise ValueError(f"dialect must be 'spark' or 'duckdb', got {dialect!r}")

    fr = feat_round
    stages = [
        f"""raw AS ({raw}),
feats AS (
  SELECT doc_id,
         round(ln({n_words} + 1.0), {fr}) AS f1,
         round(CAST(length(text) AS DOUBLE) / {n_words}, {fr}) AS f2,
         round(CAST({n_stop} AS DOUBLE) / {n_words}, {fr}) AS f3,
         round(CAST({n_vowel} AS DOUBLE) / length(text), {fr}) AS f4,
         CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
  FROM raw WHERE length(text) > 0
),
stats AS (
  SELECT round(avg(f1), {fr}) AS m1, round(avg(f2), {fr}) AS m2,
         round(avg(f3), {fr}) AS m3, round(avg(f4), {fr}) AS m4,
         round(sqrt(avg(f1 * f1) - avg(f1) * avg(f1)), {fr}) AS s1,
         round(sqrt(avg(f2 * f2) - avg(f2) * avg(f2)), {fr}) AS s2,
         round(sqrt(avg(f3 * f3) - avg(f3) * avg(f3)), {fr}) AS s3,
         round(sqrt(avg(f4 * f4) - avg(f4) * avg(f4)), {fr}) AS s4
  FROM feats
),
z AS (
  SELECT doc_id, y,
         round((f1 - m1) / s1, {fr}) AS z1,
         round((f2 - m2) / s2, {fr}) AS z2,
         round((f3 - m3) / s3, {fr}) AS z3,
         round((f4 - m4) / s4, {fr}) AS z4
  FROM feats CROSS JOIN stats
),
w0 AS (SELECT 0.0 AS w1, 0.0 AS w2, 0.0 AS w3, 0.0 AS w4, 0.0 AS b)"""
    ]
    sig = (
        "round(1.0 / (1.0 + exp(-(z1 * w1 + z2 * w2 + z3 * w3 + z4 * w4 + b))), "
        f"{prob_round})"
    )
    for t in range(1, iters + 1):
        p = t - 1
        stages.append(f"""p{t} AS (
  SELECT doc_id, y, z1, z2, z3, z4, {sig} AS p
  FROM z CROSS JOIN w{p}
),
g{t} AS (
  SELECT round(avg((p - y) * z1), {step_round}) AS g1,
         round(avg((p - y) * z2), {step_round}) AS g2,
         round(avg((p - y) * z3), {step_round}) AS g3,
         round(avg((p - y) * z4), {step_round}) AS g4,
         round(avg(p - y), {step_round}) AS gb
  FROM p{t}
),
w{t} AS (
  SELECT round(w1 - {lr} * g1, {step_round}) AS w1,
         round(w2 - {lr} * g2, {step_round}) AS w2,
         round(w3 - {lr} * g3, {step_round}) AS w3,
         round(w4 - {lr} * g4, {step_round}) AS w4,
         round(b - {lr} * gb, {step_round}) AS b
  FROM w{p} CROSS JOIN g{t}
)""")
    unrolled = ",\n".join(stages)
    return f"""
WITH {unrolled},
score AS (
  SELECT y, {sig} AS p FROM z CROSS JOIN w{iters}
)
SELECT coef, round(value, 6) + 0.0 AS value FROM (
  SELECT 'w_log_words' AS coef, w1 AS value FROM w{iters}
  UNION ALL SELECT 'w_mean_word_len', w2 FROM w{iters}
  UNION ALL SELECT 'w_stop_ratio', w3 FROM w{iters}
  UNION ALL SELECT 'w_vowel_ratio', w4 FROM w{iters}
  UNION ALL SELECT 'bias', b FROM w{iters}
  UNION ALL SELECT 'train_acc',
    avg(CASE WHEN (p >= 0.5) = (y = 1.0) THEN 1.0 ELSE 0.0 END) FROM score
) t
ORDER BY coef
"""


def logreg_gd_parity(
    spark,
    documents: DataFrame,
    iters: int = 3,
    lr: float = 0.5,
    feat_round: int = 9,
    prob_round: int = 12,
    step_round: int = 9,
) -> DataFrame:
    """Run the Spark dialect of :func:`logreg_gd_parity_sql` over the given
    documents frame — STEPWISE. Spark inlines every CTE reference, so the
    single unrolled query (which DuckDB executes as-is for the oracle)
    exploded to 428 Exchanges / 172 duplicate parquet scans at iters=3:
    every p{t} re-expands the full raw→feats→stats→z feature pipeline and
    the w-chain doubles the subtree per step (r14 optimization round,
    guide §3.3). Here the standardized feature table z is materialized
    ONCE (localCheckpoint — doc_id + 4 doubles + label, the standard
    feature-table artifact a production trainer persists anyway) and each
    gradient step runs as its own tiny query against it, with the 1-row
    weight frame checkpointed between steps. Per-stage SQL text is the
    generator's verbatim; every stage boundary is already rounded
    (feat/prob/step_round) precisely so execution/summation-order
    differences cannot reach the output — the same argument that makes
    the face cross-engine exact makes the stepwise plan value-identical
    to the inlined one. Proven hash-exact against the unchanged DuckDB
    oracle after the rewrite.

    The mapInPandas Newton trainer (:func:`fit_logreg`) stays the
    throughput path; this twin pins gradient-step SEMANTICS."""
    documents.createOrReplaceTempView("documents")
    stop_list = "'the', 'a', 'of', 'and', 'to', 'in', 'is', 'it', 'for', 'on'"
    n_stop = f"size(filter(ws, w -> w IN ({stop_list})))"
    n_words = "size(ws)"
    n_vowel = "length(regexp_replace(lower(text), '[^aeiou]', ''))"
    fr = feat_round
    z = spark.sql(
        f"""WITH raw AS (
  SELECT doc_id, text, lang, split(lower(text), ' ') AS ws FROM documents),
feats AS (
  SELECT doc_id,
         round(ln({n_words} + 1.0), {fr}) AS f1,
         round(CAST(length(text) AS DOUBLE) / {n_words}, {fr}) AS f2,
         round(CAST({n_stop} AS DOUBLE) / {n_words}, {fr}) AS f3,
         round(CAST({n_vowel} AS DOUBLE) / length(text), {fr}) AS f4,
         CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
  FROM raw WHERE length(text) > 0
),
stats AS (
  SELECT round(avg(f1), {fr}) AS m1, round(avg(f2), {fr}) AS m2,
         round(avg(f3), {fr}) AS m3, round(avg(f4), {fr}) AS m4,
         round(sqrt(avg(f1 * f1) - avg(f1) * avg(f1)), {fr}) AS s1,
         round(sqrt(avg(f2 * f2) - avg(f2) * avg(f2)), {fr}) AS s2,
         round(sqrt(avg(f3 * f3) - avg(f3) * avg(f3)), {fr}) AS s3,
         round(sqrt(avg(f4 * f4) - avg(f4) * avg(f4)), {fr}) AS s4
  FROM feats
)
SELECT doc_id, y,
       round((f1 - m1) / s1, {fr}) AS z1,
       round((f2 - m2) / s2, {fr}) AS z2,
       round((f3 - m3) / s3, {fr}) AS z3,
       round((f4 - m4) / s4, {fr}) AS z4
FROM feats CROSS JOIN stats"""
    ).localCheckpoint(eager=False)
    z.createOrReplaceTempView("logreg_parity_z")
    # w0 spelled exactly as the generator's (decimal-literal zeros: the
    # first step's arithmetic must see the same operand types)
    spark.sql(
        "SELECT 0.0 AS w1, 0.0 AS w2, 0.0 AS w3, 0.0 AS w4, 0.0 AS b"
    ).localCheckpoint(eager=True).createOrReplaceTempView("logreg_parity_w")
    sig = (
        "round(1.0 / (1.0 + exp(-(z1 * w1 + z2 * w2 + z3 * w3 + z4 * w4 + b))), "
        f"{prob_round})"
    )
    for _ in range(iters):
        w = spark.sql(
            f"""WITH p AS (
  SELECT doc_id, y, z1, z2, z3, z4, {sig} AS p
  FROM logreg_parity_z CROSS JOIN logreg_parity_w
),
g AS (
  SELECT round(avg((p - y) * z1), {step_round}) AS g1,
         round(avg((p - y) * z2), {step_round}) AS g2,
         round(avg((p - y) * z3), {step_round}) AS g3,
         round(avg((p - y) * z4), {step_round}) AS g4,
         round(avg(p - y), {step_round}) AS gb
  FROM p
)
SELECT round(w1 - {lr} * g1, {step_round}) AS w1,
       round(w2 - {lr} * g2, {step_round}) AS w2,
       round(w3 - {lr} * g3, {step_round}) AS w3,
       round(w4 - {lr} * g4, {step_round}) AS w4,
       round(b - {lr} * gb, {step_round}) AS b
FROM logreg_parity_w CROSS JOIN g"""
        ).localCheckpoint(eager=True)
        w.createOrReplaceTempView("logreg_parity_w")
    return spark.sql(
        f"""WITH score AS (
  SELECT y, {sig} AS p FROM logreg_parity_z CROSS JOIN logreg_parity_w
)
SELECT coef, round(value, 6) + 0.0 AS value FROM (
  SELECT 'w_log_words' AS coef, w1 AS value FROM logreg_parity_w
  UNION ALL SELECT 'w_mean_word_len', w2 FROM logreg_parity_w
  UNION ALL SELECT 'w_stop_ratio', w3 FROM logreg_parity_w
  UNION ALL SELECT 'w_vowel_ratio', w4 FROM logreg_parity_w
  UNION ALL SELECT 'bias', b FROM logreg_parity_w
  UNION ALL SELECT 'train_acc',
    avg(CASE WHEN (p >= 0.5) = (y = 1.0) THEN 1.0 ELSE 0.0 END) FROM score
) t
ORDER BY coef"""
    )
