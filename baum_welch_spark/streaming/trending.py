"""Streaming trending keys: sliding-window counts + top-k rank at read time.

The "what's hot right now" face: counts per key over OVERLAPPING windows
(every ``slide`` a fresh ``length``-long window), so a burst shows up within
one slide instead of waiting for a tumbling boundary.

Ranking is deliberately NOT in the streaming query: per-window top-k needs
every key's final count, which in append mode is only known at window close
— and complete-output ranking keeps all-windows-ever in state. The scalable
split (the standard serving-layer pattern): the stream emits finalized
(window, key, cnt) rows once the watermark closes each window —
watermark-bounded state, mergeable counts, map-side partial agg — and
``topk_per_window`` ranks the window-count-sized sink at query time, a
per-window window function over (windows x keys), never the event stream.

Streaming face of the batch ``relational.top_event_type_per_user`` family;
state per trigger is (open windows x distinct keys) rows, a watermark-
bounded constant, not event-count-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def trending_counts(
    events: DataFrame,
    key: str = "event_type",
    length: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Sliding-window key counts: (w_start, w_end, key, cnt)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", length, slide).alias("w"), F.col(key).alias("key"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "key",
            "cnt",
        )
    )


def topk_per_window(counts: DataFrame, k: int = 3) -> DataFrame:
    """Rank the finalized sink rows: top-k keys per window, deterministic
    tiebreak (cnt desc, key asc). Input is window-count-sized (the sink),
    so the per-window window function never touches raw events."""
    w = Window.partitionBy("w_start").orderBy(F.desc("cnt"), F.asc("key"))
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("w_start", "key", "cnt", "rk")
    )
