"""Structured Streaming surface (SURVEY §2.5: absent in the reference —
batch SequenceFiles only; this is the engine's streaming extension).

  * stream_events          — file-stream source over the events parquet with
                             the pinned schema (no inference in streaming)
  * session_agg            — event-time sessionization via session_window +
                             watermark (the streaming twin of
                             operators.relational.sessionize)
  * windowed_event_counts  — tumbling-window counts per event type

All are writeStream-agnostic: callers pick sink/trigger. Tests drive them
with a memory sink + processAllAvailable (synchronous batch-of-parquet).

Scale: state is keyed by (user_id) / (window, event_type); watermarking
bounds state size, and shuffle partitioning follows the grouping keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

def _events_schema(ts_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # streaming sources never infer schemas, but the driver testdata's ts
    # encoding has varied by round (INT64 nanos vs TIMESTAMP_NTZ micros — see
    # sources.io); probe the parquet footer with a batch read and pin the
    # matching schema, then normalize to a UTC TIMESTAMP column either way
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    probed = spark.read.parquet(f"{sf_dir}/events.parquet").schema["ts"].dataType
    # file-stream sources need a directory; glob-filter down to the events file
    raw = (
        spark.readStream.format("parquet")
        .schema(_events_schema(probed))
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    if isinstance(probed, T.LongType):
        return raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def session_agg(events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour") -> DataFrame:
    """Event-time sessions: session_window(ts, gap) per user with a watermark
    for late data. Emits one row per closed session."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def windowed_event_counts(events: DataFrame, window: str = "5 minutes") -> DataFrame:
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(F.col("w.start").alias("w_start"), "event_type", "n", "total_value")
    )


def windowed_distinct_users(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """Tumbling-window approximate distinct users per event type — the
    streaming cardinality dashboard (unique visitors per hour).

    Uses the HLL++ sketch (``approx_count_distinct``): mergeable, so
    partial aggregation happens map-side and per-key state is one fixed-size
    sketch, not a user set — state stays bounded however many distinct users
    a window sees. The merge is order-insensitive, so the streaming result
    equals the identical batch aggregation exactly (tested), unlike
    sum-of-floats aggregates.
    """
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.approx_count_distinct("user_id", rsd=0.02).alias("n_users_approx"))
        .select(F.col("w.start").alias("w_start"), "event_type", "n_users_approx")
    )


#: DuckDB-exact oracle for the windowed_event_counts STREAMING face (r11):
#: Spark's window(ts, '5 minutes') starts at epoch-aligned 5-minute
#: boundaries, so the batch twin is integer floor arithmetic on epoch_us.
#: Boundaries are BIGINT micros on both sides (no timestamp
#: canonicalization in the driver hash); round(sum, 4) of 2-decimal values
#: sits >= 0.0049 from any rounding boundary, so float summation order
#: cannot flip the hash.
WINDOWED_COUNTS_STREAM_SQL = """
SELECT (epoch_us(ts) // 300000000) * 300000000 AS w_start_us, event_type,
       count(*) AS n, round(sum(value), 4) AS total_value
FROM events GROUP BY 1, 2 ORDER BY 1, 2
"""

#: DuckDB-exact oracle for the session_agg STREAMING face (r11): Spark's
#: session_window merges an event whose window is overlapping OR ADJACENT
#: to the open session (an event landing EXACTLY at the session end — last
#: ts + gap — still merges; pinned by the planted-boundary test in
#: tests/test_streaming.py, which caught the `>=` draft of this oracle),
#: so the batch twin breaks on strict `diff > gap`, the same convention as
#: the batch relational sessionize face. Session end is last-event ts +
#: gap. The running-sum session id is order-safe under ts ties (tied rows
#: can't be breaks), and HUGEINT is pinned to BIGINT as in SESSIONIZE_SQL.
def sessions_stream_sql(gap_minutes: int = 30) -> str:
    gap_us = gap_minutes * 60 * 1_000_000
    # the running-sum window orders by (us, event_id) — the SAME total
    # order as the brk lag window. Ordering by us alone left tied
    # timestamps straddling a break nondeterministic: with e1/e2 tied 1us
    # past a session end, e1 carries brk=1; a sum frame that happened to
    # enumerate e2 first would assign e2 to the PREVIOUS session (review
    # r11). Ties carry brk=0 beyond the first, so under the shared total
    # order both land in the new session, matching session_window.
    return f"""
WITH flagged AS (
  SELECT user_id, event_id, epoch_us(ts) AS us, value,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL THEN 1
              WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > {gap_us} THEN 1
              ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sid AS (
  SELECT *, CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
  FROM flagged
)
SELECT user_id, min(us) AS start_us, max(us) + {gap_us} AS end_us,
       count(*) AS n_events, round(sum(value), 4) AS total_value
FROM sid GROUP BY user_id, sid
ORDER BY user_id, start_us
"""


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str = "complete") -> None:
    """Drive a streaming query over the (finite) file source to completion
    synchronously; results land in the in-memory table ``name``.

    Default output mode is ``complete``: in append mode the windows past the
    final watermark would stay in state forever on a finite source (the last
    windows never emit). Production sinks with unbounded sources would use
    append + watermark eviction.
    """
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
