"""Deterministic sampling and dataset splitting for training pipelines
(north-star §2.7 adjunct: every 100 TB training run needs a reproducible
train/val split and class-balanced subsamples).

All splits are HASH-based, not RNG-based: membership is a pure function of
the row's key, so it is stable across reruns, partitionings, cluster sizes,
and late-arriving recomputation (rand()-based splits silently reshuffle
membership whenever the plan re-executes — a classic training-data bug).

The hash is standard MD5 (not Spark's engine-specific xxhash64), so the SAME
split is reproducible in any engine or language — a DuckDB validation query,
a Python audit script, and the 1000-executor Spark job all agree on every
row's membership. Still JVM-side codegen on the Spark path (F.md5).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 1_000_000


def _keyed_hash(key_col: str, seed: int):
    """portable_hash60("key:seed") — the ONE definition of this module's
    seeded-hash convention (splits, samples, and caps all derive from it).
    Engine-agnostic: DuckDB spells the identical value
    ('0x' || substr(md5(k || ':' || s), 1, 15))::BIGINT."""
    from baum_welch_spark.functions.columns import portable_hash60

    return portable_hash60(F.concat_ws(":", F.col(key_col).cast("string"), F.lit(str(seed))))


def _bucket(key_col: str, seed: int):
    return F.pmod(_keyed_hash(key_col, seed), F.lit(_BUCKETS))


def hash_split(
    df: DataFrame, key_col: str, weights: list[float], seed: int = 0
) -> list[DataFrame]:
    """Split rows into len(weights) disjoint, exhaustive frames by hashing
    the key: same key -> same split, forever. Weights are normalized."""
    total = sum(weights)
    cuts, acc = [], 0.0
    for w in weights:
        acc += w / total
        cuts.append(int(acc * _BUCKETS))
    # float accumulation can land the last cut at _BUCKETS-1 (e.g. weights
    # [7,2,1]), silently dropping rows that hash to the top bucket — pin it
    # so the splits are exhaustive by construction
    cuts[-1] = _BUCKETS
    b = _bucket(key_col, seed)
    out, lo = [], 0
    for hi in cuts:
        out.append(df.filter((b >= lo) & (b < hi)))
        lo = hi
    return out


def stratified_sample(
    df: DataFrame, strata_col: str, fractions: dict, key_col: str, seed: int = 0
) -> DataFrame:
    """Per-stratum deterministic downsampling: keep a row iff its key hash
    falls under its stratum's fraction. Strata absent from ``fractions``
    are dropped (explicit is better than silent 100%)."""
    frac = F.create_map(
        *[x for kv in fractions.items() for x in (F.lit(kv[0]), F.lit(float(kv[1])))]
    )
    keep_under = frac[F.col(strata_col)]
    return df.filter(
        keep_under.isNotNull() & (_bucket(key_col, seed) < keep_under * _BUCKETS)
    )


# DuckDB-exact oracle for the driver-contract face (events stratified on
# event_type with fractions view=0.25 / purchase=1.0 / click=0.5, key
# event_id, seed=3): membership reproduces _bucket bit-for-bit because the
# hash is portable MD5, not an engine-private function.
STRATIFIED_SAMPLE_SQL = """
SELECT event_id, event_type
FROM events
WHERE (CASE event_type WHEN 'view' THEN 0.25 WHEN 'purchase' THEN 1.0
                       WHEN 'click' THEN 0.5 END) IS NOT NULL
  AND (('0x' || substr(md5(event_id::VARCHAR || ':3'), 1, 15))::BIGINT % 1000000)
      < (CASE event_type WHEN 'view' THEN 0.25 WHEN 'purchase' THEN 1.0
                         WHEN 'click' THEN 0.5 END) * 1000000
"""


def cap_per_group(
    df: DataFrame, group_col: str, key_col: str, k: int, seed: int = 11
) -> DataFrame:
    """Deterministic per-group cap: keep at most ``k`` rows per group, chosen
    by portable-hash order of the row key — the corpus-balancing op that caps
    documents per domain/source so no single boilerplate-heavy site dominates
    a training mix.

    Hash order (never rand()) makes the kept set a pure function of the data:
    stable across reruns, partitionings, and engines, and a uniform random
    sample of each group. Tiebreak by key keeps the rank total even under
    hash collisions.

    Scale: one shuffle on the group key; the window's rank short-circuits
    per group — no global sort. A pathologically hot group concentrates its
    rows on one partition (the same skew any per-group top-k has); salt via
    AQE skew handling if a group exceeds a partition.
    """
    from pyspark.sql import Window

    h = _keyed_hash(key_col, seed)
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(key_col).asc())
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )


# driver face: documents capped at 20 per source (sf0.01 has 25/source, so
# the cap bites), emitting the kept ids. DuckDB reproduces the hash order.
CAP_PER_GROUP_SQL = """
WITH ranked AS (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY ('0x' || substr(md5(doc_id::VARCHAR || ':11'), 1, 15))::BIGINT ASC,
                    doc_id ASC
         ) AS rk
  FROM documents
)
SELECT doc_id, source FROM ranked WHERE rk <= 20
"""


def weighted_sample(
    df: DataFrame, key_col: str, weight: Column, seed: int = 5
) -> DataFrame:
    """Per-row weighted Bernoulli sample: keep each row with probability
    ``weight`` (a column expression in [0, 1], clamped), decided by the
    row key's portable hash — deterministic like every sampler here (a
    rand()-based weighted sample resamples membership on every plan
    re-execution). The per-group generalization of ``stratified_sample``,
    for continuous weights (e.g. upweight long documents or high-value
    events in a training mix).
    """
    w = F.least(F.greatest(weight, F.lit(0.0)), F.lit(1.0))
    return df.filter(_bucket(key_col, seed) < w * _BUCKETS)


# driver face: events kept with probability value/100 (clamped at 1), keyed
# by event_id — reproduced exactly by DuckDB via the portable hash.
WEIGHTED_SAMPLE_SQL = """
SELECT event_id, event_type, value
FROM events
WHERE (('0x' || substr(md5(event_id::VARCHAR || ':5'), 1, 15))::BIGINT % 1000000)
      < least(greatest(value / 100, 0.0), 1.0) * 1000000
"""


def sampled_quantiles(
    events: DataFrame, rate: float = 0.2, seed: int = 23
) -> DataFrame:
    """Portable sample-based quantile sketch: exact interpolated quantiles
    over a deterministic hash sample, next to the full-data truth —
    (event_type, p50, p95, p50_est, p95_est), ordered by event_type.

    The quantile story in one face: ``value_quantiles`` is the exact
    operator (full sort-agg), ``value_approx_quantiles`` is the engine-
    native sketch (engine-private internals, rows-only checkable), and THIS
    is the portable sketch — because membership is the MD5 hash of the row
    key, any engine reconstructs the identical sample and hence the
    identical estimate, so an *approximate* quantile gets a DuckDB-exact
    oracle (same trick as the portable HLL in ``sketches.py``).

    Scale: the full-data sort-agg you cannot afford at 100 TB shrinks to
    ``rate`` of the rows before the shuffle (the filter sits on the scan);
    sample error is O(1/sqrt(rate * n_group)) — at 100 TB even rate = 1e-4
    leaves millions of rows per group, far tighter than any fixed-memory
    sketch. The exact twin columns here are sf-scale evidence of that bound.
    """
    est = (
        events.filter(_bucket("event_id", seed) < F.lit(int(rate * _BUCKETS)))
        .groupBy("event_type")
        .agg(
            F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50_est"),
            F.round(F.expr("percentile(value, 0.95)"), 6).alias("p95_est"),
        )
    )
    exact = events.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.95)"), 6).alias("p95"),
    )
    return exact.join(est, "event_type").orderBy("event_type")


# driver face: quantiles over the seed-23, 20% hash sample of events vs the
# full-data truth. DuckDB rebuilds the identical sample row set (portable
# MD5 membership), and interpolated quantiles over identical rows agree to
# 6 dp (same cross-engine contract value_quantiles already pins).
SAMPLED_QUANTILES_SQL = """
WITH s AS (
  SELECT event_type, value FROM events
  WHERE (('0x' || substr(md5(event_id::VARCHAR || ':23'), 1, 15))::BIGINT % 1000000)
        < 200000
),
est AS (
  SELECT event_type,
         round(quantile_cont(value, 0.5), 6) AS p50_est,
         round(quantile_cont(value, 0.95), 6) AS p95_est
  FROM s GROUP BY event_type
),
ex AS (
  SELECT event_type,
         round(quantile_cont(value, 0.5), 6) AS p50,
         round(quantile_cont(value, 0.95), 6) AS p95
  FROM events GROUP BY event_type
)
SELECT ex.event_type, ex.p50, ex.p95, est.p50_est, est.p95_est
FROM ex JOIN est ON est.event_type = ex.event_type
ORDER BY ex.event_type
"""


def mixture_sample(
    df: DataFrame, group_col: str, weights: dict, key_col: str, seed: int = 7
) -> DataFrame:
    """Domain-mixture resampling: downsample groups so the kept rows follow
    the ``weights`` proportions as closely as integer counts allow, keeping
    as many rows as feasible WITHOUT upsampling any group — the standard
    "reweight web/books/code sources to a target mix" step of an LLM
    training pipeline.

    The feasible scale is ``min over groups of n_g / w_g``; each group keeps
    ``floor(w_g * scale)`` rows (so the binding group keeps everything),
    chosen by portable-hash rank within the group — deterministic across
    reruns, partitionings, and engines, like every sampler in this module.
    Groups absent from ``weights`` are dropped.

    Scale: group counts are a combinable aggregate (group-cardinality-sized,
    broadcast back); selection is one per-group rank window — same shape and
    caveats as ``cap_per_group``.
    """
    from pyspark.sql import Window

    # Normalize only when the weights don't already sum to ~1: for e.g.
    # 0.6/0.3/0.1 the float sum is 0.9999999999999999, and dividing by it
    # would perturb each weight one ulp away from the literals an oracle SQL
    # uses — floor(w * scale) could then disagree at exact-integer
    # boundaries. Already-normalized weights pass through bit-identical.
    total = sum(weights.values())
    if abs(total - 1.0) <= 1e-9:
        normed = dict(weights)
    else:
        normed = {k: v / total for k, v in weights.items()}
    wmap = F.create_map(*[x for kv in normed.items() for x in (F.lit(kv[0]), F.lit(kv[1]))])
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__n"))
    scale = (
        counts.withColumn("__w", wmap[F.col(group_col)])
        .where(F.col("__w").isNotNull())
        .agg(F.min(F.col("__n") / F.col("__w")).alias("__scale"))
    )
    h = _keyed_hash(key_col, seed)
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(key_col).asc())
    return (
        df.withColumn("__w", wmap[F.col(group_col)])
        .where(F.col("__w").isNotNull())
        .join(F.broadcast(scale), how="cross")
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= F.floor(F.col("__w") * F.col("__scale")))
        .drop("__n", "__w", "__scale", "__rk")
    )


def temperature_mixture(
    df: DataFrame, group_col: str, key_col: str, alpha: float = 0.5, seed: int = 13
) -> DataFrame:
    """Temperature-flattened domain mixing: keep per-group counts
    proportional to n_g^alpha (alpha < 1 upweights small domains — the
    multilingual/domain-balancing exponent of XLM-R / GLaM, public
    knowledge), capped by the no-upsampling feasibility constraint. The
    weights need no normalization: floor-allocation is invariant to scaling
    all weights, so w_g = n_g^alpha is used directly.

    With the default alpha = 0.5 the weight is ``sqrt(n)`` — IEEE-exact
    (correctly rounded) in every engine, so keep counts are bit-identical
    cross-engine and the face is DuckDB exact. Other alphas go through
    ``pow`` whose last-ulp behavior is libm-specific; semantics identical,
    oracle-exactness only guaranteed for 0.5.

    Scale shape: group counts are one combinable aggregate broadcast back;
    selection is the per-group portable-hash rank window (cap_per_group's
    shape and caveats).
    """
    from pyspark.sql import Window

    wcol = (
        F.sqrt(F.col("__n").cast("double"))
        if alpha == 0.5
        else F.pow(F.col("__n").cast("double"), F.lit(float(alpha)))
    )
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__n"))
    scale = counts.agg(F.min(F.col("__n") / wcol).alias("__scale"))
    keep = (
        counts.join(F.broadcast(scale), how="cross")
        .select(
            group_col,
            F.floor(wcol * F.col("__scale")).cast("bigint").alias("__keep"),
        )
    )
    h = _keyed_hash(key_col, seed)
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(key_col).asc())
    return (
        df.join(F.broadcast(keep), group_col)
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= F.col("__keep"))
        .drop("__keep", "__rk")
    )


def temperature_mixture_documents(documents: DataFrame) -> DataFrame:
    """Driver-contract face: same source buckets as the fixed-weight mixture
    face, flattened at alpha = 0.5."""
    b = F.concat(
        F.lit("bucket"),
        (F.regexp_extract("source", r"(\d+)$", 1).cast("bigint") % 3).cast("string"),
    )
    docs = documents.withColumn("bucket", b)
    out = temperature_mixture(docs, "bucket", "doc_id")
    return out.select("doc_id", "bucket").orderBy("doc_id")


TEMPERATURE_MIXTURE_SQL = """
WITH b AS (
  SELECT doc_id,
         'bucket' || (regexp_extract(source, '(\\d+)$', 1)::BIGINT % 3)::VARCHAR AS bucket
  FROM documents
),
counts AS (SELECT bucket, count(*) AS n FROM b GROUP BY bucket),
k AS (
  SELECT bucket,
         CAST(floor(sqrt(n::DOUBLE) * (SELECT min(n::DOUBLE / sqrt(n::DOUBLE)) FROM counts)) AS BIGINT) AS keep
  FROM counts
),
ranked AS (
  SELECT doc_id, bucket,
         row_number() OVER (
           PARTITION BY bucket
           ORDER BY ('0x' || substr(md5(doc_id::VARCHAR || ':13'), 1, 15))::BIGINT ASC,
                    doc_id ASC
         ) AS rk
  FROM b
)
SELECT r.doc_id, r.bucket FROM ranked r JOIN k ON r.bucket = k.bucket
WHERE r.rk <= k.keep
ORDER BY doc_id
"""


# driver face: documents re-mixed to 60/30/10 over three source buckets
# (srcN mapped by trailing number mod 3), keyed by doc_id. The bucket trick
# exercises non-uniform group sizes at sf0.01 (rest of the sources dropped).
_MIX_WEIGHTS = {"bucket0": 0.6, "bucket1": 0.3, "bucket2": 0.1}


def mixture_sample_documents(documents: DataFrame) -> DataFrame:
    """Driver-contract face: bucket sources by trailing digit mod 3, then
    mixture-resample doc_ids to a 60/30/10 target."""
    b = F.concat(
        F.lit("bucket"),
        (F.regexp_extract("source", r"(\d+)$", 1).cast("bigint") % 3).cast("string"),
    )
    docs = documents.withColumn("bucket", b)
    out = mixture_sample(docs, "bucket", _MIX_WEIGHTS, "doc_id")
    return out.select("doc_id", "bucket").orderBy("doc_id")


MIXTURE_SAMPLE_SQL = """
WITH b AS (
  SELECT doc_id,
         'bucket' || (regexp_extract(source, '(\\d+)$', 1)::BIGINT % 3)::VARCHAR AS bucket
  FROM documents
),
weighted AS (
  SELECT doc_id, bucket,
         CASE bucket WHEN 'bucket0' THEN 0.6::DOUBLE WHEN 'bucket1' THEN 0.3::DOUBLE
                     WHEN 'bucket2' THEN 0.1::DOUBLE END AS w
  FROM b
),
counts AS (SELECT bucket, count(*) AS n FROM weighted WHERE w IS NOT NULL GROUP BY bucket),
scale AS (
  SELECT min(n / (CASE bucket WHEN 'bucket0' THEN 0.6::DOUBLE WHEN 'bucket1' THEN 0.3::DOUBLE
                              WHEN 'bucket2' THEN 0.1::DOUBLE END)) AS s
  FROM counts
),
ranked AS (
  SELECT doc_id, bucket, w,
         row_number() OVER (
           PARTITION BY bucket
           ORDER BY ('0x' || substr(md5(doc_id::VARCHAR || ':7'), 1, 15))::BIGINT ASC,
                    doc_id ASC
         ) AS rk
  FROM weighted WHERE w IS NOT NULL
)
SELECT doc_id, bucket FROM ranked, scale WHERE rk <= floor(w * s)
ORDER BY doc_id
"""
