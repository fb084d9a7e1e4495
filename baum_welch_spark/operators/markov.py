"""SQL-expressible faces of the HMM dataflow — the DuckDB-checkable forms of
the reference's aggregation stages (SURVEY §5.4).

The E-step UDF itself is non-relational, but its downstream stages are pure
Catalyst and are checked exactly through these queries:

  * ``seq_build``          — S1/M1: corpus construction from events
  * ``transition_counts``  — A1-A3: group-by-stripe-key + sum, on the
    fully-observed analogue (empirical symbol bigrams — the M-step of a
    degenerate HMM whose states are observed)
  * ``transition_model``   — A4: normalize-to-distribution window
  * ``model_half_distance``— D4: convergence metric as an equi-join +
    Frobenius norm (reference isConverged, BaumWelchDriver.java:196-207,
    expressed relationally as promised in SURVEY §2.5)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from baum_welch_spark.operators.sequences import build_sequences, symbol_dictionary

# shared SQL fragment: dense-code event_type lexicographically (matches
# operators.sequences.symbol_dictionary)
CODED_SQL = """
  SELECT user_id, event_id, ts,
         (dense_rank() OVER (ORDER BY event_type) - 1) AS sym
  FROM events
"""


def seq_build(events: DataFrame) -> DataFrame:
    """Oracle face of build_sequences: scalar columns only (length + the
    comma-joined symbol string) so value hashing is array-free."""
    seqs = build_sequences(events)
    return seqs.select(
        "seq_id",
        F.size("obs").alias("t_len"),
        F.array_join(F.transform("obs", lambda x: x.cast("string")), ",").alias("obs_str"),
    )


SEQ_BUILD_SQL = f"""
WITH coded AS ({CODED_SQL})
SELECT user_id AS seq_id, count(*) AS t_len,
       string_agg(sym::VARCHAR, ',' ORDER BY ts, event_id) AS obs_str
FROM coded
GROUP BY user_id
"""


def seq_decode_names(events: DataFrame) -> DataFrame:
    """S5 decode-join face: round-trip the encoded corpus back through the
    symbol-name dimension (posexplode obs -> broadcast join on sym ->
    re-assemble in sequence order).

    This is the relational form of the reference's DistributedCache name-map
    decode (MapWritableCache.java:49-109, BaumWelchMapper.java:61-63): the
    name dictionary is side data joined to coded output. Scale: the dictionary
    is vocab-sized (broadcast); the explode/re-group shuffles on seq_id, the
    corpus's natural partitioning.
    """
    seqs = build_sequences(events)
    names = symbol_dictionary(events)  # (event_type, sym)
    exploded = seqs.select("seq_id", F.posexplode("obs").alias("pos", "sym"))
    return (
        exploded.join(F.broadcast(names), "sym")
        .groupBy("seq_id")
        .agg(
            F.count(F.lit(1)).alias("t_len"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "event_type"))),
                    lambda x: x["event_type"],
                ),
                ",",
            ).alias("names_str"),
        )
    )


SEQ_DECODE_NAMES_SQL = """
SELECT user_id AS seq_id, count(*) AS t_len,
       string_agg(event_type, ',' ORDER BY ts, event_id) AS names_str
FROM events
GROUP BY user_id
"""


def _coded(events: DataFrame) -> DataFrame:
    d = symbol_dictionary(events)
    return events.join(F.broadcast(d), "event_type").select("user_id", "event_id", "ts", "sym")


def transition_counts(events: DataFrame) -> DataFrame:
    """Empirical bigram transition counts (i -> j) over per-user event streams.

    The A1-A3 shape: a window lead over the sequence ordering, then
    groupBy + sum with map-side partial aggregation. Scale: one shuffle on
    user_id for the window, one tiny aggregation on (i, j).
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = _coded(events).withColumn("j", F.lead("sym").over(w))
    return (
        pairs.filter(F.col("j").isNotNull())
        .groupBy(F.col("sym").alias("i"), "j")
        .agg(F.count(F.lit(1)).cast("double").alias("weight"))
    )


TRANSITION_COUNTS_SQL = f"""
WITH coded AS ({CODED_SQL}),
pairs AS (
  SELECT sym AS i,
         lead(sym) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS j
  FROM coded
)
SELECT i, j, CAST(count(*) AS DOUBLE) AS weight
FROM pairs WHERE j IS NOT NULL
GROUP BY i, j
"""


def transition_model(events: DataFrame) -> DataFrame:
    """A4 normalize: P(j|i) = count(i,j) / sum_j count(i,j) via a window.

    count/count division is exact, so no rounding is needed for the oracle.
    """
    w = Window.partitionBy("i")
    return (
        transition_counts(events)
        .withColumn("prob", F.col("weight") / F.sum("weight").over(w))
        .select("i", "j", "prob")
    )


TRANSITION_MODEL_SQL = f"""
WITH counts AS ({TRANSITION_COUNTS_SQL})
SELECT i, j, weight / sum(weight) OVER (PARTITION BY i) AS prob
FROM counts
"""


def model_half_distance(events: DataFrame) -> DataFrame:
    """D4 as a join: fit the bigram model on two disjoint halves of the
    corpus (users split by parity) and compute the Frobenius distance
    between the two transition matrices.

    This is the relational expression of the reference's convergence test
    (two model scans + ||A1 - A2||_F, BaumWelchDriver.java:196-207 /
    BaumWelchUtils.java:237-266). Missing (i, j) cells count as prob 0 via
    the full outer join + coalesce.
    """
    # ONE pass over the corpus (r14 optimization round, guide §2.3/§3.3):
    # the old per-half `half_model(coded.filter(parity))` calls each
    # re-expanded the whole coded subtree — events scan + dictionary
    # aggregate + broadcast join + sequence window ran TWICE (8 parquet
    # scans in the static plan). The parity filter commutes with the
    # per-user lead window (removing other users cannot change a lead
    # within a user's rows), so both halves now come from one windowed
    # pass grouped by (half, i, j); the vocab²-sized count table is
    # materialized once and each half's normalization runs over it.
    # Value-identical: counts are integer-exact doubles, and the window
    # sum over (half, i) adds integer-valued doubles — exact at any
    # summation order below 2^53.
    coded = _coded(events)
    w_ord = Window.partitionBy("user_id").orderBy("ts", "event_id")
    counts = (
        coded.withColumn("j", F.lead("sym").over(w_ord))
        .filter(F.col("j").isNotNull())
        .groupBy(
            (F.col("user_id") % 2).alias("half"), F.col("sym").alias("i"), "j"
        )
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
        .localCheckpoint(eager=False)
    )
    w_norm = Window.partitionBy("half", "i")
    model = counts.withColumn("prob", F.col("w") / F.sum("w").over(w_norm))
    m1 = model.filter(F.col("half") == 0).select("i", "j", F.col("prob").alias("p1"))
    m2 = model.filter(F.col("half") == 1).select("i", "j", F.col("prob").alias("p2"))
    joined = m1.join(m2, ["i", "j"], "full_outer").select(
        F.coalesce("p1", F.lit(0.0)).alias("p1"), F.coalesce("p2", F.lit(0.0)).alias("p2")
    )
    return joined.agg(
        F.round(F.sqrt(F.sum(F.pow(F.col("p1") - F.col("p2"), 2))), 9).alias("frob_dist")
    )


MODEL_HALF_DISTANCE_SQL = f"""
WITH coded AS ({CODED_SQL}),
pairs AS (
  SELECT user_id, sym AS i,
         lead(sym) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS j
  FROM coded
),
m1 AS (
  SELECT i, j, CAST(count(*) AS DOUBLE) / sum(CAST(count(*) AS DOUBLE)) OVER (PARTITION BY i) AS p1
  FROM pairs WHERE j IS NOT NULL AND user_id % 2 = 0 GROUP BY i, j
),
m2 AS (
  SELECT i, j, CAST(count(*) AS DOUBLE) / sum(CAST(count(*) AS DOUBLE)) OVER (PARTITION BY i) AS p2
  FROM pairs WHERE j IS NOT NULL AND user_id % 2 = 1 GROUP BY i, j
)
SELECT round(sqrt(sum(pow(coalesce(p1, 0) - coalesce(p2, 0), 2))), 9) AS frob_dist
FROM m1 FULL OUTER JOIN m2 USING (i, j)
"""
