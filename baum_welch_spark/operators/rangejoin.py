"""Range join: point-in-interval joins without an equality key.

The reference has no joins at all (SURVEY §2.5); this is part of the
north-star relational surface (§2.7), the companion of the as-of join in
``operators/asof.py``. A naive ``a.ts BETWEEN b.start AND b.end`` join with
no equi-key is a cross product in Spark (BroadcastNestedLoopJoin) — fatal at
scale. The standard fix, implemented here, is *bucketing*: quantize time
into fixed-width buckets, explode each interval over the buckets it covers,
equi-join points to intervals on the bucket id (a plain shuffled hash join
Catalyst can plan, with AQE skew handling), then apply the exact range
predicate. Each (point, interval) pair meets on exactly one bucket — the
point's — so no post-join dedup is needed.

Bucket width trades explode blowup (intervals spanning many buckets) against
join fan-in (many points per bucket): pick it near the typical interval
length so intervals cover <= 2 buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 300,
    how: str = "inner",
    interval_key: str | None = None,
) -> DataFrame:
    """Join point rows to interval rows where
    ``start < point_ts AND point_ts <= end`` (open-closed, the trailing-window
    convention). ``how`` is 'inner' or 'left_interval' (keep intervals with no
    matching point anywhere, exactly once, with point columns null —
    requires ``interval_key``, a column uniquely identifying interval rows).

    Bucketing: interval rows are exploded over
    ``sequence(floor(epoch(start)/W), floor(epoch(end)/W))`` and points carry
    ``floor(epoch(ts)/W)``; the join is then an equi-join on the bucket plus
    the exact predicate. The left-ness is applied AGAINST THE ORIGINAL
    interval rows (anti-join on ``interval_key``), never the exploded ones —
    a left join on the exploded side would emit one spurious null-point row
    per non-matching bucket of every interval.
    """

    def epoch(c: Column) -> Column:
        # microsecond-precision epoch so sub-second points near a bucket edge
        # still land in the right bucket
        return F.unix_micros(c) / 1_000_000.0

    w = F.lit(float(bucket_seconds))
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(epoch(F.col(start_col)) / w),
                F.floor(epoch(F.col(end_col)) / w),
            )
        ),
    )
    pt = points.withColumn("__bucket", F.floor(epoch(F.col(point_ts)) / w))
    cond = (
        (iv["__bucket"] == pt["__bucket"])
        & (pt[point_ts] > iv[start_col])
        & (pt[point_ts] <= iv[end_col])
    )
    inner = iv.join(pt, cond, "inner").drop("__bucket")
    if how == "inner":
        return inner
    if how != "left_interval":
        raise ValueError(f"how must be 'inner' or 'left_interval', got {how!r}")
    if interval_key is None:
        raise ValueError("how='left_interval' requires interval_key (unique interval id)")
    unmatched = intervals.join(
        inner.select(interval_key).distinct(), interval_key, "left_anti"
    ).select(
        *intervals.columns,
        *[F.lit(None).cast(f.dataType).alias(f.name) for f in points.schema.fields],
    )
    return inner.unionByName(unmatched)


PURCHASE_CONTEXT_MINUTES = 5


def purchase_view_context(events: DataFrame, window_minutes: int = PURCHASE_CONTEXT_MINUTES) -> DataFrame:
    """For every purchase event: how many view events (from ANY user — no
    equi-key, a true range join) happened in the ``window_minutes`` before it.

    Purchases with zero preceding views are kept (count 0): the match counts
    are aggregated from the inner bucketed join and joined back to the
    purchase set, which keeps the left-ness out of the exploded join.
    """
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("buyer_id"),
        (F.col("ts") - F.expr(f"INTERVAL {window_minutes} MINUTES")).alias("w_start"),
        F.col("ts").alias("w_end"),
    )
    views = events.filter(F.col("event_type") == "view").select(F.col("ts").alias("v_ts"))
    matched = point_in_interval_join(
        views, purchases, "v_ts", "w_start", "w_end", bucket_seconds=window_minutes * 60
    )
    counts = matched.groupBy("purchase_id").agg(F.count(F.lit(1)).alias("n_views"))
    return (
        purchases.select("purchase_id", "buyer_id")
        .join(counts, "purchase_id", "left")
        .select(
            "purchase_id",
            "buyer_id",
            F.coalesce(F.col("n_views"), F.lit(0)).cast("bigint").alias("n_views"),
        )
    )


PURCHASE_VIEW_CONTEXT_SQL = f"""
SELECT p.event_id AS purchase_id,
       p.user_id  AS buyer_id,
       count(v.event_id) AS n_views
FROM events p
LEFT JOIN events v
  ON v.event_type = 'view'
 AND v.ts >  p.ts - INTERVAL {PURCHASE_CONTEXT_MINUTES} MINUTE
 AND v.ts <= p.ts
WHERE p.event_type = 'purchase'
GROUP BY p.event_id, p.user_id
"""
