"""As-of (point-in-time) join — an operator Spark lacks natively.

Implemented as the union + forward-fill-window composition (SURVEY §2.7
preference order (a): composition of existing DataFrame ops), NOT a per-group
pandas merge_asof: one shuffle on the join key, no Python, no per-group
memory blowup — the 100 TB-safe formulation.

    left(key, ts, ...)  asof-join  right(key, ts, payload...)
      = for each left row, the right row with the greatest ts strictly
        before left.ts within the same key (strict-before semantics).

Mechanics: tag both sides, union, window over (key) ordered by
(ts, tag, seq); forward-fill the right payload with last(ignorenulls);
keep left rows. Right rows at an equal timestamp sort AFTER left rows
(tag order), so they are not visible — strict "<".

The engine's concrete instance, ``purchases_with_last_view``, joins each
purchase event to the user's most recent earlier view event; its DuckDB
oracle uses the identical union+window formulation (deterministic under
timestamp ties, unlike raw ASOF JOIN).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str = "ts",
    right_cols: list[str] | None = None,
    seq: str | None = None,
) -> DataFrame:
    """Strict-before as-of join: left rows gain ``asof_<c>`` for each payload
    column c of ``right`` plus ``asof_ts``; ``seq`` breaks timestamp ties
    deterministically (required if either side can repeat (key, ts))."""
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, ts)]
    # a right payload column sharing a left column's name would be nulled on
    # left rows by the schema-align step below and silently clobber the
    # left's own values in the output — refuse instead of corrupting
    collisions = [c for c in right_cols if c in left.columns]
    if collisions:
        raise ValueError(
            f"right payload column(s) {collisions} collide with left columns; "
            "rename them (e.g. .withColumnRenamed) before asof_join"
        )
    order = [F.col(ts).asc(), F.col("_tag").asc()] + ([F.col(seq).asc()] if seq else [])
    lt = left.withColumn("_tag", F.lit(0))
    keep = [on, ts, *right_cols]
    if seq and seq in right.columns and seq not in keep:
        keep.append(seq)  # the tiebreak column must survive on right rows
    rt = right.select(*keep).withColumn("_tag", F.lit(1))
    if seq and seq not in lt.columns:
        # seq resolvable only from the right: give left rows a null seq so
        # the align below (rt.select(*lt.columns)) keeps it on right rows
        # instead of dropping it and breaking the window's orderBy
        lt = lt.withColumn(seq, F.lit(None).cast(dict(rt.dtypes)[seq]))
    # align schemas: left keeps its own columns, right payload is nullable on left rows
    for c in right_cols:
        lt = lt.withColumn(c, F.lit(None).cast(dict(rt.dtypes)[c]))
    lcols = [c for c in left.columns]
    for c in lcols:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None).cast(dict(lt.dtypes)[c]))
    rt = rt.select(*lt.columns)
    unioned = lt.unionByName(rt)
    w = Window.partitionBy(on).orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    filled = unioned.withColumn("_asof_ts", F.last(F.when(F.col("_tag") == 1, F.col(ts)), ignorenulls=True).over(w))
    for c in right_cols:
        filled = filled.withColumn(
            f"asof_{c}", F.last(F.when(F.col("_tag") == 1, F.col(c)), ignorenulls=True).over(w)
        )
    return (
        filled.filter(F.col("_tag") == 0)
        .select(*lcols, F.col("_asof_ts").alias("asof_ts"), *[F.col(f"asof_{c}") for c in right_cols])
    )


def purchases_with_last_view(events: DataFrame) -> DataFrame:
    """Each purchase event joined to the same user's most recent strictly
    earlier view event (value carried over). Output is scalar-only and
    deterministic: ties broken by event_id."""
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts", "value"
    )
    views = events.filter(F.col("event_type") == "view").select(
        "user_id", "event_id", "ts", F.col("value").alias("view_value")
    )
    out = asof_join(
        purchases,
        views.select("user_id", "ts", "view_value", "event_id"),
        on="user_id",
        ts="ts",
        right_cols=["view_value"],
        seq="event_id",
    )
    return out.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        F.round("value", 6).alias("purchase_value"),
        F.unix_micros("asof_ts").alias("view_ts_us"),
        F.round("asof_view_value", 6).alias("view_value"),
    )


PURCHASES_LAST_VIEW_SQL = """
WITH tagged AS (
  SELECT user_id, event_id, ts, value, 0 AS tag, NULL::DOUBLE AS view_value
  FROM events WHERE event_type = 'purchase'
  UNION ALL
  SELECT user_id, event_id, ts, NULL::DOUBLE AS value, 1 AS tag, value AS view_value
  FROM events WHERE event_type = 'view'
),
filled AS (
  SELECT *,
         last_value(CASE WHEN tag = 1 THEN epoch_us(ts) END IGNORE NULLS)
           OVER w AS view_ts_us,
         last_value(CASE WHEN tag = 1 THEN view_value END IGNORE NULLS)
           OVER w AS last_view_value
  FROM tagged
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, tag, event_id
               ROWS UNBOUNDED PRECEDING)
)
SELECT user_id, event_id, epoch_us(ts) AS ts_us,
       round(value, 6) AS purchase_value,
       view_ts_us,
       round(last_view_value, 6) AS view_value
FROM filled WHERE tag = 0
"""
