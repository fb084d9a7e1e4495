"""Robust (median/MAD) outlier detection over grouped event streams —
distribution-free anomaly flagging for the monitoring side of a data
pipeline (beyond-reference, §2.7 north star: a 100 TB ingest needs its
own telemetry scored for anomalies).

Why MAD and not z-scores: the mean and standard deviation are themselves
dragged by the outliers they are meant to find (one 1e9 reading inflates
sigma until nothing is three sigmas out); the median and the median
absolute deviation have a 50% breakdown point. The 1.4826 consistency
constant rescales MAD to sigma-equivalents under normality, so ``k`` reads
like a z-score cutoff.

Physical plan: two grouped EXACT percentile aggregations (Spark's
``percentile`` — the same linearly-interpolated quantile DuckDB's
``quantile_cont`` computes, which is what makes the face DuckDB-exact)
joined back onto the rows. Both aggregate frames are group-count-sized, so
AQE broadcasts them; the rows shuffle once per aggregation on the group
key. At 100 TB exact ``percentile`` holds each group's values on one
reducer — swap in ``approx_percentile`` (t-digest sketch, mergeable,
map-side combined) for the identical plan shape with bounded memory; the
trade is documented exactness for the oracle, nothing structural.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: MAD -> sigma-equivalent consistency constant under normality
#: (1 / Phi^-1(3/4); the textbook value, reproduced as the same literal in
#: the SQL oracle so both engines multiply identical doubles)
MAD_SIGMA = 1.4826


def mad_outliers(
    events: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    k: float = 3.5,
) -> DataFrame:
    """Rows whose value sits more than ``k`` robust sigmas from their
    group's median: |value - median| > k * 1.4826 * MAD.

    Groups with MAD == 0 (more than half the group identical) are skipped
    — every deviation there is "infinitely" anomalous and the score is
    undefined; flagging them is a data-quality question
    (``quality.repetition_stats`` territory), not an outlier one.

    Output: (event_id, group, value, med, mad, score) with score the
    robust sigma distance rounded to 6, ordered by score desc then
    event_id for determinism.
    """
    med = events.groupBy(group_col).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("med")
    )
    dev = events.join(med, group_col).withColumn(
        "absdev", F.abs(F.col(value_col) - F.col("med"))
    )
    mad = dev.groupBy(group_col).agg(F.expr("percentile(absdev, 0.5)").alias("mad"))
    return (
        dev.join(mad, group_col)
        .filter(
            (F.col("mad") > 0)
            & (F.col("absdev") > F.lit(k) * F.lit(MAD_SIGMA) * F.col("mad"))
        )
        .select(
            "event_id",
            F.col(group_col).alias("grp"),
            value_col,
            "med",
            "mad",
            F.round(F.col("absdev") / (F.lit(MAD_SIGMA) * F.col("mad")), 6).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("event_id"))
    )


# DuckDB oracle: quantile_cont is the same linearly-interpolated quantile
# Spark's percentile computes (position p*(n-1), linear between neighbors),
# so med/mad/score match bit-for-bit on doubles.
MAD_OUTLIERS_SQL = """
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med
  FROM events GROUP BY event_type
),
dev AS (
  SELECT e.event_id, e.event_type, e.value, m.med,
         abs(e.value - m.med) AS absdev
  FROM events e JOIN med m USING (event_type)
),
mad AS (
  SELECT event_type, quantile_cont(absdev, 0.5) AS mad
  FROM dev GROUP BY event_type
)
SELECT d.event_id, d.event_type AS grp, d.value, d.med, m.mad,
       round(d.absdev / (1.4826 * m.mad), 6) AS score
FROM dev d JOIN mad m USING (event_type)
WHERE m.mad > 0 AND d.absdev > 3.5 * 1.4826 * m.mad
ORDER BY score DESC, d.event_id ASC
"""


def mad_outliers_approx(
    events: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    k: float = 3.5,
    accuracy: int = 10000,
) -> DataFrame:
    """The 100 TB swap-in the exact face documents: the identical plan
    shape with ``approx_percentile`` (t-digest-style sketch: mergeable,
    map-side combined, bounded memory per group) replacing the exact
    ``percentile`` that holds a whole group's values on one reducer.
    Same output schema as :func:`mad_outliers`. ``accuracy`` is Spark's
    1/relative-error knob (default 10000 -> ~1e-4 rank error); flags can
    differ from exact only for rows whose score sits within the sketch
    error of the ``k`` cutoff — pinned by
    tests/test_anomaly.py::test_mad_outliers_approx_agrees_at_sf01."""
    med = events.groupBy(group_col).agg(
        F.expr(f"approx_percentile({value_col}, 0.5, {accuracy})").alias("med")
    )
    dev = events.join(med, group_col).withColumn(
        "absdev", F.abs(F.col(value_col) - F.col("med"))
    )
    mad = dev.groupBy(group_col).agg(
        F.expr(f"approx_percentile(absdev, 0.5, {accuracy})").alias("mad")
    )
    return (
        dev.join(mad, group_col)
        .filter(
            (F.col("mad") > 0)
            & (F.col("absdev") > F.lit(k) * F.lit(MAD_SIGMA) * F.col("mad"))
        )
        .select(
            "event_id",
            F.col(group_col).alias("grp"),
            value_col,
            "med",
            "mad",
            F.round(F.col("absdev") / (F.lit(MAD_SIGMA) * F.col("mad")), 6).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("event_id"))
    )
