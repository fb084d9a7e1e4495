"""Stream-stream joins: correlate two live event streams within a time
bound (absent in the reference — SURVEY §2.5; the streaming twin of the
batch range join in ``operators/rangejoin.py``).

Spark requires BOTH sides watermarked plus a time-range join condition so
it can bound the join state: each side buffers only rows younger than
(watermark + window). Without the range condition the state grows forever —
the stream analogue of the unbounded cross join the batch range join's
bucketing avoids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def view_purchase_stream_join(
    events: DataFrame,
    window_minutes: int = 5,
    watermark: str = "1 hour",
) -> DataFrame:
    """Per-user (purchase, preceding-view) pairs within ``window_minutes``,
    both sides streaming. Emits one row per qualifying pair in append mode
    once the watermark passes."""
    views = (
        events.filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("v_ts"),
        )
        .withWatermark("v_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", watermark)
    )
    return views.join(
        purchases,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("v_ts") > F.col("p_ts") - F.expr(f"INTERVAL {window_minutes} MINUTES"))
        & (F.col("v_ts") <= F.col("p_ts")),
        "inner",
    ).select("purchase_id", F.col("p_user").alias("user_id"), "view_id", "v_ts", "p_ts")


#: DuckDB-exact oracle for the view_purchase_stream_join face (r11): an
#: INNER stream-stream join emits each qualifying pair as soon as both
#: sides have arrived (the watermark only bounds buffered state, it gates
#: nothing on the output path), so over a finite source the appended set
#: is exactly the batch interval join — strict/inclusive bounds compared
#: at integer-microsecond resolution on both engines, timestamps emitted
#: as BIGINT micros so no timestamp canonicalization is involved.
def view_purchase_join_sql(window_minutes: int = 5) -> str:
    return f"""
SELECT p.event_id AS purchase_id, p.user_id, v.event_id AS view_id,
       epoch_us(v.ts) AS v_ts_us, epoch_us(p.ts) AS p_ts_us
FROM events p JOIN events v
  ON v.user_id = p.user_id
 AND v.event_type = 'view' AND p.event_type = 'purchase'
 AND v.ts > p.ts - INTERVAL {window_minutes} MINUTE AND v.ts <= p.ts
ORDER BY purchase_id, view_id
"""
