"""Mutation-shaped batch operators: MERGE-style upsert and SCD2 history.

The reference engine has no mutation surface at all (SURVEY §2 — its jobs
are read->aggregate->write); these are north-star warehouse faces (§2.7):
the two update patterns every snapshot-maintenance pipeline needs, expressed
as pure joins/windows so Catalyst plans them like any other query.

Scale posture:
- ``merge_upsert`` is ONE equi-join on the merge key (full-outer), the
  Delta/Iceberg MERGE INTO dataflow without the transaction log: at 100 TB
  the base side is bucketed/partitioned storage, the delta side is small ->
  AQE broadcasts it and only matched base files are rewritten; here both
  sides shuffle-hash-join on the key. No window, no skew pivot (merge keys
  are unique per side).
- ``scd2_history`` is per-entity windows (lag to detect change, lead to
  close intervals) — partitioned by the entity key, so it scales with
  entity cardinality; no global window anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def order_updates(orders: DataFrame) -> DataFrame:
    """Deterministic synthetic delta for ``merge_upsert``: every 7th order
    gets a 5% price bump (update), and every 97th key is re-issued shifted
    above the table's key range as a brand-new order (insert). Derived from
    the snapshot itself so the face needs no extra input table."""
    # All price arithmetic in integer cents: round-half behavior on the
    # x.xx5 boundary differs between engines (Spark HALF_UP vs DuckDB
    # round-half-even), so a `round(price * 1.05, 2)` face is not
    # cross-engine deterministic. floor() over exact integers is.
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    upd = (
        orders.where(F.col("o_orderkey") % 7 == 0)
        .select(
            "o_orderkey",
            (F.floor(cents * 21 / 20) / 100.0).alias("u_totalprice"),
            F.lit("update").alias("u_kind"),
        )
    )
    # Insert keys must not collide with ANY base key at ANY sf: shift by the
    # smallest power of 10 strictly above max(o_orderkey) (a fixed +1e8
    # offset silently turns inserts into overwrites once keys reach 1e8).
    # The offset is built via string repeat, not pow(): 10^k loses exactness
    # in double beyond 2^53, string-concat BIGINT math never does. 1-row
    # broadcast, same shape as the model collects elsewhere.
    mx = orders.agg(F.max("o_orderkey").alias("mx"))
    offset = F.concat(
        F.lit("1"), F.repeat(F.lit("0"), F.length(F.col("mx").cast("string")))
    ).cast("long")
    ins = (
        orders.where(F.col("o_orderkey") % 97 == 0)
        .crossJoin(F.broadcast(mx))
        .select(
            (F.col("o_orderkey") + offset).alias("o_orderkey"),
            (F.floor(cents / 2) / 100.0).alias("u_totalprice"),
            F.lit("insert").alias("u_kind"),
        )
    )
    return upd.unionByName(ins)


def merge_upsert(orders: DataFrame) -> DataFrame:
    """MERGE INTO semantics (WHEN MATCHED UPDATE / WHEN NOT MATCHED INSERT)
    as a single full-outer equi-join on the merge key.

    Returns the post-merge snapshot with an ``action`` audit column
    ('keep' | 'update' | 'insert') — the shape a Delta-style MERGE commits,
    minus the log. One shuffle total (both sides hash-partition on
    o_orderkey); at scale the delta side is broadcast and the join is
    map-side.
    """
    delta = order_updates(orders)
    base = orders.select(
        "o_orderkey",
        (F.round(F.col("o_totalprice") * 100).cast("long") / 100.0).alias("b_totalprice"),
    )
    j = base.join(delta, "o_orderkey", "full_outer")
    return (
        j.select(
            "o_orderkey",
            F.coalesce("u_totalprice", "b_totalprice").alias("o_totalprice"),
            F.when(F.col("u_kind").isNull(), F.lit("keep"))
            .otherwise(F.col("u_kind"))
            .alias("action"),
        )
        .orderBy("o_orderkey")
    )


MERGE_UPSERT_SQL = """
WITH cents_t AS (
  SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
off_t AS (
  -- smallest power of 10 strictly above max(o_orderkey), via string repeat
  -- (exact BIGINT; pow() would round beyond 2^53) — mirrors order_updates
  SELECT CAST('1' || repeat('0', length(CAST(max(o_orderkey) AS VARCHAR))) AS BIGINT) AS off
  FROM orders
),
delta AS (
  SELECT o_orderkey, CAST(floor(cents * 21 / 20) AS BIGINT) / 100.0 AS u_totalprice,
         'update' AS u_kind
  FROM cents_t WHERE o_orderkey % 7 = 0
  UNION ALL
  SELECT o_orderkey + (SELECT off FROM off_t) AS o_orderkey,
         CAST(floor(cents / 2) AS BIGINT) / 100.0 AS u_totalprice, 'insert' AS u_kind
  FROM cents_t WHERE o_orderkey % 97 = 0
),
base AS (SELECT o_orderkey, cents / 100.0 AS b_totalprice FROM cents_t)
SELECT coalesce(b.o_orderkey, d.o_orderkey) AS o_orderkey,
       coalesce(d.u_totalprice, b.b_totalprice) AS o_totalprice,
       CASE WHEN d.u_kind IS NULL THEN 'keep' ELSE d.u_kind END AS action
FROM base b FULL OUTER JOIN delta d ON b.o_orderkey = d.o_orderkey
ORDER BY o_orderkey
"""


def scd2_history(events: DataFrame) -> DataFrame:
    """Type-2 slowly-changing-dimension build: collapse each user's event
    stream into validity intervals of ``event_type`` — a new version opens
    whenever the type CHANGES (consecutive repeats fold into one interval).

    Output: (user_id, event_type, valid_from, valid_to, version); the
    current row has valid_to NULL. Validity bounds are epoch MICROSECONDS
    (BIGINT) — the repo-wide oracle convention (see SESSIONIZE_SQL): raw
    timestamp columns compare at different resolutions across engines.
    Two per-user windows (lag to mark change
    points, lead over change points to close intervals) — partitioned by
    user_id throughout, so parallelism is user cardinality and no row
    leaves its hash partition between the two windows (single shuffle).
    Ordering ties broken by event_id for cross-engine determinism.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changed = (
        # NTZ parquet (sf0.001) vs LTZ (sf0.01): session TZ is pinned UTC
        # (session.py), so the cast is a no-op semantically and lets
        # unix_micros accept both
        events.select("user_id", F.col("ts").cast("timestamp").alias("ts"), "event_id", "event_type")
        .withColumn("prev_type", F.lag("event_type").over(w))
        .where(F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type")))
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        changed.select(
            "user_id",
            "event_type",
            F.unix_micros("ts").alias("valid_from"),
            F.unix_micros(F.lead("ts").over(w2)).alias("valid_to"),
            F.row_number().over(w2).cast("bigint").alias("version"),
        )
        .orderBy("user_id", "version")
    )


SCD2_HISTORY_SQL = """
WITH marked AS (
  SELECT user_id, ts, event_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events
),
changed AS (
  SELECT user_id, ts, event_id, event_type FROM marked
  WHERE prev_type IS NULL OR prev_type <> event_type
)
SELECT user_id, event_type,
       epoch_us(ts) AS valid_from,
       epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
         AS valid_to,
       CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
            AS BIGINT) AS version
FROM changed
ORDER BY user_id, version
"""
