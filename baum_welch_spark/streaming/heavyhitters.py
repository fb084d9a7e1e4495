"""Streaming heavy-hitters: windowed Count-Min sketch over an event stream —
the fixed-memory "what's trending per hour" operator. Streaming face of
:mod:`..operators.sketches`.

State shape is the whole point: a naive per-(window, key) count keeps one
state row per DISTINCT key per window (unbounded for high-cardinality keys
like URLs or user agents); the CMS keeps at most DEPTH x WIDTH rows per
window — a config constant. Counts are mergeable sums, so map-side partial
aggregation and late-data merging work unchanged, and the streaming sketch
equals the batch sketch on the same data exactly (order-insensitive).

Estimation against the materialized sketch reuses ``sketches.cms_estimate``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from baum_welch_spark.operators.sketches import CMS_DEPTH, _probe_cols


def windowed_cms(
    events: DataFrame,
    key: str = "event_type",
    window: str = "1 hour",
    watermark: str = "1 hour",
) -> DataFrame:
    """Per-window CMS build over ``key``: output
    (w_start, row, bucket, cnt) — at most DEPTH x WIDTH state rows per
    window, evicted once the watermark passes the window."""
    probes = events.withWatermark("ts", watermark).select("ts", *_probe_cols(key))
    per_row = [
        probes.select("ts", F.lit(i).alias("row"), F.col(f"b{i}").alias("bucket"))
        for i in range(CMS_DEPTH)
    ]
    exploded = per_row[0]
    for p in per_row[1:]:
        exploded = exploded.unionByName(p)
    return (
        exploded.groupBy(F.window("ts", window).alias("w"), "row", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("w.start").alias("w_start"), "row", "bucket", "cnt")
    )
