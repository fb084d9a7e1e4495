"""Streaming deduplication: the streaming face of ``operators.dedup``
(absent in the reference — SURVEY §2.5; part of the north-star training-data
pipeline, §2.7).

``dedup_stream`` drops repeated keys within a watermark horizon via
``dropDuplicatesWithinWatermark`` — state holds one entry per key only
until the watermark passes it, so state size is bounded by the duplicate
horizon, not the stream length (plain ``dropDuplicates`` on a stream keeps
every key forever — unusable at 100 TB/day).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark.sql import types as T

from baum_welch_spark.streaming.sessionize import _events_schema


def stream_events_dir(spark: SparkSession, directory: str) -> DataFrame:
    """File-stream over a directory of events-schema parquet files (ts
    encoding probed from the footer and normalized to UTC timestamp, as in
    ``stream_events``)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        probed = spark.read.parquet(directory).schema["ts"].dataType
    except Exception:
        # directory empty (or not yet created) at stream start — normal for
        # file streams where files arrive later; assume the nanos-as-long
        # encoding the testdata generator uses
        probed = T.LongType()
    raw = spark.readStream.format("parquet").schema(_events_schema(probed)).load(directory)
    if isinstance(probed, T.LongType):
        return raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def dedup_stream(
    events: DataFrame, keys: list[str] | None = None, watermark: str = "1 hour"
) -> DataFrame:
    """Emit each key's first-seen row; duplicates arriving within the
    watermark horizon are dropped. Keys default to ``event_id``."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        keys or ["event_id"]
    )
