"""Relational query surface (SURVEY §2.7): the standard OLAP operators the
driver's TPC-H-ish tables invite — filter/project/join/agg/window/top-k —
expressed declaratively so Catalyst handles pushdown, pruning, join
selection, and partial aggregation.

The reference has no joins/sorts/windows at all (SURVEY §2.5); these are the
capability extensions a usable engine needs. All floating aggregate outputs
are rounded in BOTH the Spark and oracle form so order-of-summation ulps
don't flip the value hash.

Scale notes per query are in each docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def q1_pricing_summary(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy groupBy with 8 aggregates.

    Scale: single shuffle on two low-cardinality keys; partial aggregation
    collapses everything map-side, the filter and 7-column projection push
    into the parquet scan.
    """
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit("1998-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("sum_disc_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))), 4
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 4)                                           AS sum_qty,
       round(sum(l_extendedprice), 4)                                      AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 4)                   AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4)     AS sum_charge,
       round(avg(l_quantity), 6)                                           AS avg_qty,
       round(avg(l_extendedprice), 6)                                      AS avg_price,
       round(avg(l_discount), 6)                                           AS avg_disc,
       count(*)                                                            AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q3_top_orders(customer: DataFrame, orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter -> fact join -> top-k by revenue.

    Scale: the filtered customer side is NOT force-broadcast — customer is
    corpus-proportional (unlike nation/region), so the hint that helps at
    small SF is an OOM at 100 TB. Catalyst/AQE auto-broadcasts it below the
    threshold and shuffles on c_custkey above it; lineitem joins orders on
    the key both sides share. Deterministic top-10 via
    (revenue desc, o_orderkey asc).
    """
    c = customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    o = orders.filter(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderkey")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


Q3_SQL = """
SELECT o_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       count(*) AS n_items
FROM customer
JOIN orders   ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY o_orderkey
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""


def q5_region_revenue(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
    nation: DataFrame, region: DataFrame,
) -> DataFrame:
    """TPC-H Q5 shape: 5-way join, dims broadcast, revenue per nation.

    Scale: region/nation are constant-size -> forced broadcast; the
    customer-derived dims side is corpus-proportional, so it is AQE-decided
    (broadcast while it fits, shuffle join on c_custkey when it doesn't).
    The remaining shuffle is lineitem|><|orders plus the final aggregation.
    """
    dims = (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region.filter(F.col("r_name") == "ASIA")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey", "n_name")
    )
    return (
        orders.join(dims, orders.o_custkey == F.col("c_custkey"))
        .join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


Q5_SQL = """
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
JOIN orders ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE r_name = 'ASIA'
GROUP BY n_name
ORDER BY revenue DESC, n_name ASC
"""


def top_event_type_per_user(events: DataFrame) -> DataFrame:
    """Top-1-per-group via window rank (the engine's top-k pattern).

    Deterministic tiebreak (count desc, event_type asc). Scale: one shuffle
    on user_id; the window reuses the groupBy partitioning.
    """
    counts = events.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("user_id").orderBy(F.desc("n"), F.asc("event_type"))
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("user_id", F.col("event_type").alias("top_event"), "n")
    )


TOP_EVENT_SQL = """
WITH counts AS (
  SELECT user_id, event_type, count(*) AS n
  FROM events GROUP BY user_id, event_type
), ranked AS (
  SELECT user_id, event_type, n,
         row_number() OVER (PARTITION BY user_id ORDER BY n DESC, event_type ASC) AS rk
  FROM counts
)
SELECT user_id, event_type AS top_event, n FROM ranked WHERE rk = 1
"""


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Batch sessionization: a new session starts when the gap to the previous
    event of the same user exceeds ``gap_minutes`` (lag + running sum of
    boundary flags — the classic Catalyst-only formulation).

    Scale: two windows over the same (user_id) partitioning -> a single
    shuffle; no UDF. The streaming twin is
    baum_welch_spark.streaming.sessionize (session_window).
    """
    us = F.unix_micros(F.col("ts"))
    _US_EXPR = "unix_micros(ts)"
    w_order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = gap_minutes * 60 * 1_000_000
    with_flag = events.withColumn(
        "new_session",
        F.when(us - F.lag(us).over(w_order) > F.lit(gap_us), 1)
        .when(F.lag(us).over(w_order).isNull(), 1)
        .otherwise(0),
    )
    with_sid = with_flag.withColumn(
        "session_seq", F.sum("new_session").over(w_order.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        with_sid.groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # integer division: DuckDB's CAST(double AS BIGINT) rounds while
            # Spark's truncates, so keep the arithmetic integral on both sides
            F.expr(f"(max({_US_EXPR}) - min({_US_EXPR})) div 1000000").alias("duration_s"),
            F.min("event_id").alias("first_event_id"),
        )
        .select("user_id", "session_seq", "n_events", "duration_s", "first_event_id")
    )


SESSIONIZE_SQL = """
WITH flagged AS (
  SELECT user_id, event_id, ts, epoch_us(ts) AS us,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL THEN 1
              WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > {gap_us} THEN 1
              ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sid AS (
  -- DuckDB promotes sum(INTEGER) to HUGEINT (int128); the driver's value
  -- hash canonicalizes HUGEINT differently from Spark's BIGINT, so pin it.
  SELECT *, CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
  FROM flagged
)
SELECT user_id, session_seq, count(*) AS n_events,
       (max(us) - min(us)) // 1000000 AS duration_s,
       min(event_id) AS first_event_id
FROM sid
GROUP BY user_id, session_seq
"""


def sessionize_sql(gap_minutes: int = 30) -> str:
    return SESSIONIZE_SQL.format(gap_us=gap_minutes * 60 * 1_000_000)


def q6_forecast_revenue(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q6 shape: pure scan + multi-predicate filter + single-row agg.
    Everything pushes into the parquet scan; zero-shuffle partial agg."""
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias("revenue"))
    )


Q6_SQL = """
SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24
"""


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def event_pivot(events: DataFrame) -> DataFrame:
    """Pivot: per-user event-type count matrix. Expressed with an explicit
    value list so the plan is a single pass (no distinct-values pre-query);
    the oracle uses the equivalent portable CASE-sum formulation."""
    return (
        events.groupBy("user_id")
        .pivot("event_type", EVENT_TYPES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, EVENT_TYPES)
        .select("user_id", *[F.col(t).alias(f"n_{t}") for t in EVENT_TYPES])
    )


EVENT_PIVOT_SQL = """
SELECT user_id,
       count(*) FILTER (event_type = 'click')    AS n_click,
       count(*) FILTER (event_type = 'error')    AS n_error,
       count(*) FILTER (event_type = 'purchase') AS n_purchase,
       count(*) FILTER (event_type = 'signup')   AS n_signup,
       count(*) FILTER (event_type = 'view')     AS n_view
FROM events GROUP BY user_id
"""


def events_rollup(events: DataFrame) -> DataFrame:
    """Rollup: event counts + value sums by (event_type, day) with subtotals
    and a grand total (grouping-sets coverage; NULL marks the rolled level)."""
    day = F.date_trunc("day", F.col("ts")).cast("date").cast("string")
    return (
        events.withColumn("day", day)
        .rollup("event_type", "day")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
        .select("event_type", "day", "n", "total_value")
    )


EVENTS_ROLLUP_SQL = """
SELECT event_type, CAST(CAST(date_trunc('day', ts) AS DATE) AS VARCHAR) AS day,
       count(*) AS n, round(sum(value), 4) AS total_value
FROM events
GROUP BY ROLLUP (event_type, day)
"""


def viewers_without_purchase(events: DataFrame) -> DataFrame:
    """Set-op surface: (user, day) pairs with a view but no purchase that
    day (EXCEPT — Catalyst plans subtract as an aggregate + anti-join)."""
    day = F.date_trunc("day", F.col("ts")).cast("date").cast("string").alias("day")
    viewers = events.filter(F.col("event_type") == "view").select("user_id", day).distinct()
    buyers = events.filter(F.col("event_type") == "purchase").select("user_id", day).distinct()
    return viewers.exceptAll(buyers).orderBy("user_id", "day")


VIEWERS_NO_PURCHASE_SQL = """
SELECT DISTINCT user_id, CAST(CAST(date_trunc('day', ts) AS DATE) AS VARCHAR) AS day
FROM events WHERE event_type = 'view'
EXCEPT
SELECT DISTINCT user_id, CAST(CAST(date_trunc('day', ts) AS DATE) AS VARCHAR) AS day
FROM events WHERE event_type = 'purchase'
ORDER BY user_id, day
"""


def value_quantiles(events: DataFrame) -> DataFrame:
    """Exact interpolated quantiles of event value per event type (the
    engine's quantile surface; the approximate twin is percentile_approx,
    checked rows-only because sketches differ across engines)."""
    return (
        events.groupBy("event_type")
        .agg(
            F.round(F.expr("percentile(value, 0.25)"), 6).alias("p25"),
            F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
            F.round(F.expr("percentile(value, 0.75)"), 6).alias("p75"),
            F.round(F.expr("percentile(value, 0.95)"), 6).alias("p95"),
        )
        .orderBy("event_type")
    )


VALUE_QUANTILES_SQL = """
SELECT event_type,
       round(quantile_cont(value, 0.25), 6) AS p25,
       round(quantile_cont(value, 0.50), 6) AS p50,
       round(quantile_cont(value, 0.75), 6) AS p75,
       round(quantile_cont(value, 0.95), 6) AS p95
FROM events GROUP BY event_type ORDER BY event_type
"""


def q4_late_orders(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q4 shape: EXISTS correlated subquery → left-semi join.

    Orders counted per priority when at least one lineitem shipped more than
    30 days after the order date. Scale: the semi-join shuffles on
    l_orderkey only once and never materializes the multiplicity of matching
    lineitems; the priority agg is a tiny second shuffle.
    """
    late = lineitem.select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            late,
            (F.col("o_orderkey") == F.col("l_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q4_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey
    AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q12_late_priority(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q12 shape: join + two-grade conditional aggregation. The
    testdata has no l_shipmode/l_commitdate (TESTDATA column adaptation,
    same precedent as q4_late_orders' 30-day lateness), so the face counts
    urgent-or-high vs lower-priority orders per RETURNFLAG among lineitems
    shipped more than 60 days after their order date.

    Scale: one equi-join shuffled on the order key, then a returnflag-sized
    CASE-sum aggregate — the conditional counts fold map-side; no second
    pass per grade.
    """
    late = lineitem.filter(F.col("l_shipdate").isNotNull())
    joined = late.join(
        orders.select("o_orderkey", "o_orderdate", "o_orderpriority"),
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        joined.groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


Q12_SQL = """
SELECT l_returnflag,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END)::BIGINT AS low_line_count
FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def q21_waiting_suppliers(
    supplier: DataFrame, nation: DataFrame, orders: DataFrame, lineitem: DataFrame
) -> DataFrame:
    """TPC-H Q21 shape — the hardest join pattern in the suite: a lineitem
    self-semi-join (the order is multi-supplier) AND a self-anti-join (this
    supplier is the ONLY late one), over finished orders, per supplier in
    one nation. Lateness adapts to the testdata columns (shipped > 60 days
    after order date; no l_receiptdate/l_commitdate — q4 precedent).

    Scale: lateness is computed ONCE (lineitem⋈orders on the order key);
    the semi and anti sides then join on the order key only — Catalyst
    runs them as LeftSemi/LeftAnti hash joins with the supplier-inequality
    as residual condition, never materializing pair multiplicity. The
    supplier/nation dims broadcast.
    """
    fin = orders.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    late = (
        lineitem.join(fin, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    others = lineitem.select(
        F.col("l_orderkey").alias("o2_orderkey"), F.col("l_suppkey").alias("o2_suppkey")
    )
    late_others = late.select(
        F.col("l_orderkey").alias("o3_orderkey"), F.col("l_suppkey").alias("o3_suppkey")
    )
    waiting = late.join(
        others,
        (F.col("l_orderkey") == F.col("o2_orderkey"))
        & (F.col("l_suppkey") != F.col("o2_suppkey")),
        "left_semi",
    ).join(
        late_others,
        (F.col("l_orderkey") == F.col("o3_orderkey"))
        & (F.col("l_suppkey") != F.col("o3_suppkey")),
        "left_anti",
    )
    dim = supplier.join(
        F.broadcast(nation.filter(F.col("n_name") == "NATION_9")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "s_name")
    return (
        waiting.join(F.broadcast(dim), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
    )


Q21_SQL = """
WITH late AS (
  SELECT l.l_orderkey, l.l_suppkey
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE o.o_orderstatus = 'F'
    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
)
SELECT s_name, count(*) AS numwait
FROM late l1
JOIN supplier s ON s.s_suppkey = l1.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey AND n.n_name = 'NATION_9'
WHERE EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM late l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
  )
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
"""


def daily_revenue_ma7(orders: DataFrame) -> DataFrame:
    """Window-frame surface: daily gross revenue with a 7-row trailing moving
    average (ROWS BETWEEN 6 PRECEDING AND CURRENT ROW over the day order).

    Scale: one shuffle for the daily agg; the window then runs over ~days
    rows — trivially small forever. Day is unique in the frame ordering, so
    the frame content (hence the average) is deterministic across engines.
    """
    daily = (
        orders.groupBy(F.date_trunc("day", F.col("o_orderdate")).cast("date").cast("string").alias("day"))
        .agg(F.round(F.sum("o_totalprice"), 4).alias("revenue"))
    )
    w = Window.orderBy("day").rowsBetween(-6, 0)
    return daily.select(
        "day", "revenue", F.round(F.avg("revenue").over(w), 4).alias("revenue_ma7")
    ).orderBy("day")


DAILY_REVENUE_MA7_SQL = """
WITH daily AS (
  SELECT CAST(CAST(date_trunc('day', o_orderdate) AS DATE) AS VARCHAR) AS day,
         round(sum(o_totalprice), 4) AS revenue
  FROM orders GROUP BY 1
)
SELECT day, revenue,
       round(avg(revenue) OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS revenue_ma7
FROM daily ORDER BY day
"""


def user_type_stats(events: DataFrame) -> DataFrame:
    """DISTINCT-aggregate surface: per event type, distinct users and events
    per active user. Scale: count(DISTINCT) expands to a two-phase agg
    (distinct on (type, user) then count) — both shuffles partial-aggregated;
    no driver-side anything.
    """
    return (
        events.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .withColumn("events_per_user", F.round(F.col("n_events") / F.col("n_users"), 6))
        .orderBy("event_type")
    )


USER_TYPE_STATS_SQL = """
SELECT event_type,
       count(DISTINCT user_id) AS n_users,
       count(*) AS n_events,
       round(count(*) * 1.0 / count(DISTINCT user_id), 6) AS events_per_user
FROM events GROUP BY event_type ORDER BY event_type
"""


def approx_distinct_users(events: DataFrame, rsd: float = 0.02) -> DataFrame:
    """HyperLogLog++ approximate distinct users per event type — the sketch
    face of :func:`user_type_stats` (rows-only check: sketch estimates are
    engine-specific). Scale: HLL sketches merge map-side, so the shuffle
    carries one ~1.5/rsd² register set per (type, partition), independent of
    user cardinality — THE pattern for distincts at 100 TB.
    """
    return (
        events.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=rsd).alias("approx_users"))
        .orderBy("event_type")
    )


def props_k_stats(events: DataFrame) -> DataFrame:
    """Semi-structured surface: parse the ``props`` JSON column with a pinned
    schema (from_json, not inference) and aggregate the extracted field.

    Scale: from_json is a codegen projection — extraction happens in the
    scan stage before the (only) shuffle; never parse JSON after a shuffle
    when the field is groupable earlier.
    """
    k = F.from_json(F.col("props"), "struct<k:int>")["k"]
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.round(F.avg("k"), 6).alias("avg_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


PROPS_K_STATS_SQL = """
SELECT event_type,
       round(avg(CAST(props->>'k' AS INTEGER)), 6) AS avg_k,
       min(CAST(props->>'k' AS INTEGER)) AS min_k,
       max(CAST(props->>'k' AS INTEGER)) AS max_k
FROM events GROUP BY event_type ORDER BY event_type
"""


def global_rank(
    df: DataFrame, order_cols: list, rank_col: str = "rk", pct_col: str | None = None
) -> DataFrame:
    """Distributed global row-numbering over a UNIQUE sort key — the scalable
    replacement for ``Window.orderBy(...)`` with no partition spec, which
    moves the whole input to ONE partition (Spark's WindowExec warns exactly
    this). Shape: range-repartition on the sort key, ``row_number`` within
    each (now sorted, disjoint) range, then add per-partition offsets
    computed from a partition-count-sized side aggregate that AQE broadcasts.
    No stage ever sees more than one range of the data; the only global
    object is the P-row offset table (P = shuffle partitions).

    ``order_cols`` must be a unique key (append a tiebreaker column), so
    ``rank() == row_number()`` and SQL semantics are preserved exactly;
    ``pct_col`` adds ``percent_rank() = (rk - 1) / (N - 1)`` (0.0 when
    N == 1, matching Spark/DuckDB).
    """
    parts = df.repartitionByRange(*order_cols).withColumn("__pid", F.spark_partition_id())
    # Materialize the pid assignment ONCE, eagerly, call-scoped:
    # repartitionByRange samples range boundaries (seeded by RDD id) and AQE
    # may give the two consumers below different shuffle readers, so a lazy
    # __pid could be recomputed differently per consumer — silently wrong
    # ranks. localCheckpoint(eager=True) pins the assignment as data and
    # truncates lineage (same pattern as bpe_train), with no global mutable
    # state and no consume-before-next-call invariant for lazy composers.
    # Callers pass the already-aggregated frame to rank, so the checkpointed
    # copy is that reduced frame (key-count-sized), not raw input.
    parts = parts.localCheckpoint(eager=True)
    sizes = parts.groupBy("__pid").agg(F.count(F.lit(1)).alias("__cnt"))
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    # single-partition window is fine here: `sizes` has one row per shuffle
    # partition (a config constant), not per data row
    offsets = sizes.select(
        "__pid",
        F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)).alias("__off"),
        F.sum("__cnt").over(Window.partitionBy()).alias("__n"),
    )
    w_local = Window.partitionBy("__pid").orderBy(*order_cols)
    out = (
        parts.join(F.broadcast(offsets), "__pid")
        .withColumn(rank_col, (F.col("__off") + F.row_number().over(w_local)).cast("bigint"))
    )
    if pct_col is not None:
        out = out.withColumn(
            pct_col,
            F.when(F.col("__n") > 1, (F.col(rank_col) - 1) / (F.col("__n") - 1)).otherwise(0.0),
        )
    return out.drop("__pid", "__off", "__n")


def user_spend_rank(events: DataFrame, top_percent: float = 0.1) -> DataFrame:
    """Rank users by total purchase value; keep the top decile by
    percent_rank.

    Scale: the ranking is user-count-sized, so a bare ``Window.orderBy``
    would serialize every user through one partition — uses
    :func:`global_rank` (range-partitioned two-phase rank) instead. The
    (total_spend, user_id) key is unique, so the distributed row_number
    equals ``rank()`` and ``percent_rank()`` exactly.
    """
    spend = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.round(F.sum("value"), 4).alias("total_spend"))
    )
    ranked = global_rank(
        spend, [F.desc("total_spend"), F.asc("user_id")], rank_col="rk", pct_col="__pct"
    )
    return (
        ranked.withColumn("pct_rank", F.round(F.col("__pct"), 6))
        .filter(F.col("pct_rank") <= top_percent)
        .select("user_id", "total_spend", "rk", "pct_rank")
        .orderBy("rk", "user_id")
    )


USER_SPEND_RANK_SQL = """
WITH spend AS (
  SELECT user_id, round(sum(value), 4) AS total_spend
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
),
ranked AS (
  SELECT user_id, total_spend,
         rank() OVER (ORDER BY total_spend DESC, user_id ASC) AS rk,
         round(percent_rank() OVER (ORDER BY total_spend DESC, user_id ASC), 6) AS pct_rank
  FROM spend
)
SELECT user_id, total_spend, rk, pct_rank FROM ranked
WHERE pct_rank <= 0.1 ORDER BY rk, user_id
"""


def user_spend_deciles(events: DataFrame) -> DataFrame:
    """Spend deciles: every purchasing user bucketed 1..10 by total spend —
    NTILE(10) semantics WITHOUT the single-partition global window NTILE
    needs. Built on :func:`global_rank`: with n rows and rank rk,
    ``ntile = floor((rk - 1) * 10 / n) + 1`` reproduces SQL NTILE exactly
    when 10 divides n, and matches the oracle's own ntile() for the general
    case via the same closed form on both sides.

    Output: (decile, n_users, min_spend, max_spend) — 10 rows.
    """
    spend = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.round(F.sum("value"), 4).alias("total_spend"))
    )
    ranked = global_rank(spend, [F.desc("total_spend"), F.asc("user_id")], rank_col="rk")
    n = ranked.agg(F.count(F.lit(1)).alias("__n"))
    return (
        ranked.join(F.broadcast(n), how="cross")
        .withColumn(
            "decile",
            (F.floor((F.col("rk") - 1) * 10 / F.col("__n")) + 1).cast("bigint"),
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.min("total_spend").alias("min_spend"),
            F.max("total_spend").alias("max_spend"),
        )
        .orderBy("decile")
    )


USER_SPEND_DECILES_SQL = """
WITH spend AS (
  SELECT user_id, round(sum(value), 4) AS total_spend
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
),
ranked AS (
  SELECT user_id, total_spend,
         row_number() OVER (ORDER BY total_spend DESC, user_id ASC) AS rk,
         count(*) OVER () AS n
  FROM spend
)
SELECT CAST(floor((rk - 1) * 10 / n) + 1 AS BIGINT) AS decile,
       count(*) AS n_users,
       min(total_spend) AS min_spend,
       max(total_spend) AS max_spend
FROM ranked
GROUP BY floor((rk - 1) * 10 / n) + 1
ORDER BY decile
"""


def value_approx_quantiles(events: DataFrame, accuracy: int = 10000) -> DataFrame:
    """Sketch face of :func:`value_quantiles`: approx_percentile
    (KLL/GK-style mergeable quantile sketch). Rows-only check — sketch
    internals are engine-specific. Scale: the sketch merges map-side;
    shuffle volume is O(partitions x sketch), independent of row count —
    exact percentile needs a full sort instead.
    """
    return (
        events.groupBy("event_type")
        .agg(
            F.percentile_approx("value", [0.5, 0.9, 0.95], accuracy).alias("q"),
        )
        .select(
            "event_type",
            F.round(F.col("q")[0], 2).alias("p50"),
            F.round(F.col("q")[1], 2).alias("p90"),
            F.round(F.col("q")[2], 2).alias("p95"),
        )
        .orderBy("event_type")
    )


def events_cube(events: DataFrame) -> DataFrame:
    """CUBE over (event_type, weekday): all 4 grouping sets in one pass
    (partial-aggregated expansion, one shuffle)."""
    base = events.select("event_type", F.dayofweek("ts").alias("weekday"), "value")
    return (
        base.cube("event_type", "weekday")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
        .orderBy(F.asc_nulls_first("event_type"), F.asc_nulls_first("weekday"))
    )


EVENTS_CUBE_SQL = """
SELECT event_type, dayofweek(ts) + 1 AS weekday, count(*) AS n,
       round(sum(value), 4) AS total_value
FROM events
GROUP BY CUBE (event_type, dayofweek(ts) + 1)
ORDER BY event_type ASC NULLS FIRST, weekday ASC NULLS FIRST
"""


def customers_without_orders(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Left-anti-join surface: customers that never placed an order, with
    their market segment. Scale: anti-join shuffles on the key once and
    short-circuits on first match — never materializes order multiplicity
    (the NOT-EXISTS plan, complement of the q4 semi-join)."""
    return (
        customer.join(
            orders.select(F.col("o_custkey").alias("c_custkey")), "c_custkey", "left_anti"
        )
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


CUSTOMERS_WITHOUT_ORDERS_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
ORDER BY c_custkey
"""


def repeat_buyer_days(events: DataFrame) -> DataFrame:
    """INTERSECT surface: (user, day) pairs that had BOTH a view and a
    purchase that day — the set-op complement of
    :func:`viewers_without_purchase`."""
    day = F.date_trunc("day", F.col("ts")).cast("date").cast("string").alias("day")
    viewers = events.filter(F.col("event_type") == "view").select("user_id", day).distinct()
    buyers = events.filter(F.col("event_type") == "purchase").select("user_id", day).distinct()
    return viewers.intersect(buyers).orderBy("user_id", "day")


REPEAT_BUYER_DAYS_SQL = """
SELECT DISTINCT user_id, CAST(CAST(date_trunc('day', ts) AS DATE) AS VARCHAR) AS day
FROM events WHERE event_type = 'view'
INTERSECT
SELECT DISTINCT user_id, CAST(CAST(date_trunc('day', ts) AS DATE) AS VARCHAR) AS day
FROM events WHERE event_type = 'purchase'
ORDER BY user_id, day
"""


def time_bucket_gapfill(events: DataFrame) -> DataFrame:
    """Hypertable-style bucketed rollup with gap filling: hourly event counts
    and value sums per event_type over each type's full [min, max] hour span,
    with empty buckets materialized (n_events=0, total_value=0) and a
    last-observation-carried-forward column for the value sum — the
    time-series resample/interpolate surface.

    Scale: the hourly agg is one combinable shuffle; the spine explode is
    calendar-sized (hours x types), never data-sized, so the left join
    broadcasts the spine side under AQE; LOCF windows over calendar-sized
    partitions. The first bucket of every type has data by construction
    (bounds come from the data), so locf_value is never null.
    """
    hour = F.date_trunc("hour", F.col("ts"))
    hourly = events.groupBy(F.col("event_type"), hour.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"), F.sum("value").alias("v")
    )
    bounds = hourly.groupBy("event_type").agg(
        F.min("bucket").alias("lo"), F.max("bucket").alias("hi")
    )
    spine = bounds.select(
        "event_type",
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias("bucket"),
    )
    joined = spine.join(hourly, ["event_type", "bucket"], "left")
    w = Window.partitionBy("event_type").orderBy("bucket")
    return joined.select(
        "event_type",
        F.col("bucket").cast("string").alias("bucket"),
        F.coalesce(F.col("n"), F.lit(0)).alias("n_events"),
        F.round(F.coalesce(F.col("v"), F.lit(0.0)), 4).alias("total_value"),
        F.round(F.last("v", ignorenulls=True).over(w), 4).alias("locf_value"),
    )


TIME_BUCKET_GAPFILL_SQL = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket,
         count(*) AS n, sum(value) AS v
  FROM events GROUP BY 1, 2
),
bounds AS (
  SELECT event_type, min(bucket) AS lo, max(bucket) AS hi FROM hourly GROUP BY 1
),
spine AS (
  SELECT event_type, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
  FROM bounds
)
SELECT s.event_type,
       CAST(s.bucket AS VARCHAR) AS bucket,
       CAST(coalesce(h.n, 0) AS BIGINT) AS n_events,
       round(coalesce(h.v, 0), 4) AS total_value,
       round(last_value(h.v IGNORE NULLS)
             OVER (PARTITION BY s.event_type ORDER BY s.bucket), 4) AS locf_value
FROM spine s LEFT JOIN hourly h
  ON h.event_type = s.event_type AND h.bucket = s.bucket
"""


def ohlc_bars(events: DataFrame) -> DataFrame:
    """Hourly OHLC (open/high/low/close) bars of ``value`` per event type —
    the time-series candlestick rollup (TimescaleDB ``candlestick_agg``
    shape). Open/close pick the value at the earliest/latest (ts, event_id)
    in the bucket — the composite key makes the pick deterministic under
    timestamp ties.

    Scale: one combinable shuffle — min_by/max_by over a struct key are
    ordinary mergeable aggregates, so partial aggregation collapses each
    partition to one row per (type, hour) before the exchange; no window,
    no second pass.
    """
    hour = F.date_trunc("hour", F.col("ts"))
    key = F.struct(F.col("ts"), F.col("event_id"))
    return (
        events.groupBy(F.col("event_type"), hour.alias("bucket"))
        .agg(
            F.round(F.min_by("value", key), 4).alias("open"),
            F.round(F.max("value"), 4).alias("high"),
            F.round(F.min("value"), 4).alias("low"),
            F.round(F.max_by("value", key), 4).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type", "bucket")
    )


OHLC_BARS_SQL = """
WITH ranked AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket, value,
         row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                            ORDER BY ts ASC, event_id ASC) AS rn_a,
         row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM events
)
SELECT event_type, bucket,
       round(max(CASE WHEN rn_a = 1 THEN value END), 4) AS open,
       round(max(value), 4) AS high,
       round(min(value), 4) AS low,
       round(max(CASE WHEN rn_d = 1 THEN value END), 4) AS close,
       count(*) AS n_events
FROM ranked
GROUP BY event_type, bucket
ORDER BY event_type, bucket
"""


def cohort_retention(events: DataFrame) -> DataFrame:
    """Weekly cohort retention: users grouped by first-activity week, counted
    in each later week they return — the standard growth-analytics matrix
    (cohort x week-offset -> retained users).

    Scale: first-week assignment is a combinable min() per user; activity
    weeks are a distinct projection pre-aggregated per (user, week) before
    the join back on user_id (AQE chooses the strategy); the final count is
    one combinable shuffle on (cohort, offset). Nothing is windowed and no
    stage is user-cardinality-bound on a single partition.

    Output: (cohort_week, week_offset, n_users), offsets >= 0, ordered.
    """
    week = F.date_trunc("week", F.col("ts"))
    activity = events.select("user_id", week.alias("wk")).distinct()
    first = activity.groupBy("user_id").agg(F.min("wk").alias("cohort_week"))
    return (
        activity.join(first, "user_id")
        .withColumn(
            "week_offset",
            F.floor(
                (F.unix_timestamp("wk") - F.unix_timestamp("cohort_week"))
                / (7 * 24 * 3600)
            ).cast("bigint"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


COHORT_RETENTION_SQL = """
WITH activity AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events
),
first AS (SELECT user_id, min(wk) AS cohort_week FROM activity GROUP BY user_id)
SELECT f.cohort_week,
       CAST(floor(date_diff('second', f.cohort_week, a.wk) / (7 * 24 * 3600)) AS BIGINT)
         AS week_offset,
       count(DISTINCT a.user_id) AS n_users
FROM activity a JOIN first f USING (user_id)
GROUP BY 1, 2
ORDER BY 1, 2
"""


def rolling_user_spend(events: DataFrame) -> DataFrame:
    """Per purchase event: the user's purchase count and value sum over the
    trailing 24 hours (inclusive) — a RANGE-interval window frame (the
    feature-engineering "recent activity" signal; complements the ROWS
    frame in daily_revenue_ma7).

    Scale: the window partitions by user_id, so parallelism is
    user-cardinality and no stage sees more than one user's events; the
    range frame is evaluated over each user's (usually small) sorted slice.

    Output: (event_id, user_id, n_24h, spend_24h) for purchase events.
    """
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-24 * 3600, 0)
    )
    return (
        events.filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            "ts",
            F.count(F.lit(1)).over(w).cast("bigint").alias("n_24h"),
            F.round(F.sum("value").over(w), 4).alias("spend_24h"),
        )
        .select("event_id", "user_id", "n_24h", "spend_24h")
        .orderBy("event_id")
    )


ROLLING_USER_SPEND_SQL = """
SELECT event_id, user_id,
       CAST(count(*) OVER w AS BIGINT) AS n_24h,
       round(sum(value) OVER w, 4) AS spend_24h
FROM events
WHERE event_type = 'purchase'
WINDOW w AS (PARTITION BY user_id ORDER BY epoch(ts)
             RANGE BETWEEN 86400 PRECEDING AND CURRENT ROW)
ORDER BY event_id
"""


def q10_returned_revenue(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame, nation: DataFrame,
) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returned items per customer.

    Orders are filtered to one quarter (partition-prunable at scale when
    orders is date-partitioned), lineitem to l_returnflag = 'R'. Scale:
    nation is constant-size -> forced broadcast; customer is
    corpus-proportional -> AQE decides broadcast vs shuffle; the big join
    (lineitem |><| orders) shuffles on the shared orderkey. Deterministic
    top-20 via (revenue desc, c_custkey asc).
    """
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = lineitem.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    cust = customer.join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
    ).select("c_custkey", "c_name", "n_name")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


Q10_SQL = """
SELECT c_custkey, c_name, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1996-04-01'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


def q14_promo_share(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share for one ship month — a
    conditional-aggregate over a fact|><|dim join reduced to one row.

    Scale: the month filter prunes lineitem before the join (pushed to the
    scan); part is corpus-proportional so the join is AQE-decided. The
    CASE-sum is a plain partial-aggregable expression — whole-stage codegen
    end to end, final exchange moves 1 row per partition.
    """
    li = lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    ).select("l_partkey", "l_extendedprice", "l_discount")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        li.join(part.select("p_partkey", "p_type"), li.l_partkey == F.col("p_partkey"))
        .agg(
            F.round(100.0 * F.sum(promo) / F.sum(rev), 6).alias("promo_pct"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


Q14_SQL = """
SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0.0 END)
             / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_pct,
       count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-03-01'
  AND l_shipdate <  TIMESTAMP '1997-04-01'
"""


def q15_top_supplier(lineitem: DataFrame, supplier: DataFrame) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with maximum revenue over one quarter.

    The max is computed once over the supplier-level aggregate (a
    supplier-count-sized frame, not the fact table) and re-joined as a
    broadcast single row — the distributed replacement for the correlated
    subquery in the spec. Revenue is rounded BEFORE the max/equality so
    both engines compare identical 4-dp values.
    """
    li = lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    rev = (
        li.groupBy("l_suppkey")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("total_revenue"))
    )
    top = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        rev.join(F.broadcast(top), rev.total_revenue == F.col("mx"))
        .join(F.broadcast(supplier), rev.l_suppkey == supplier.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


Q15_SQL = """
WITH rev AS (
  SELECT l_suppkey,
         round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-07-01'
    AND l_shipdate <  TIMESTAMP '1996-10-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
ORDER BY s_suppkey
"""


def q19_bracket_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q19 shape: disjunctive multi-bracket predicate over the
    fact|><|dim join (brand x size x quantity brackets OR-ed together).

    Scale: the per-bracket conjuncts cannot prune the scan individually,
    but the OR of the three l_quantity ranges IS derivable and pushes to
    the lineitem scan; the p_brand IN (...) superset pushes to part. The
    residual disjunction evaluates inside codegen after the join.
    """
    j = lineitem.join(part.select("p_partkey", "p_brand", "p_size"),
                      lineitem.l_partkey == F.col("p_partkey"))
    b = (
        ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#15") & F.col("p_size").between(1, 25)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#19") & F.col("p_size").between(1, 35)
           & F.col("l_quantity").between(20, 30))
    )
    return j.filter(b).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


Q19_SQL = """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#2'  AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1  AND 11)
   OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#19' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
"""


def funnel_conversion(events: DataFrame, deadline_hours: int = 24) -> DataFrame:
    """Ordered funnel with a conversion deadline (view -> click -> purchase):
    a user advances a stage only by an event strictly AFTER the previous
    stage's timestamp and within ``deadline_hours`` of it — the
    product-analytics conversion query, non-vacuous on sparse streams.

    Shape: three per-user conditional-min aggregations, each one groupBy
    shuffle on user_id; the stage anchors travel via user-count-sized
    joins (AQE-decided broadcast). No window functions, no event-to-event
    self-join — at 100 TB the only big shuffles are the per-user
    aggregations of the already-filtered event scan.

    Output: (stage, step, n_users, pct_of_step1) ordered by position.
    """
    us = F.col("ts").cast("timestamp")
    dl = F.expr(f"INTERVAL {int(deadline_hours)} HOURS")
    t1 = events.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", us)).alias("t1")
    )
    t2 = (
        events.join(t1, "user_id")
        .groupBy("user_id")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == "click")
                    & (us > F.col("t1"))
                    & (us <= F.col("t1") + dl),
                    us,
                )
            ).alias("t2")
        )
    )
    t3 = (
        events.join(t2, "user_id")
        .groupBy("user_id")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (us > F.col("t2"))
                    & (us <= F.col("t2") + dl),
                    us,
                )
            ).alias("t3")
        )
    )
    stages = (
        t1.join(t2, "user_id", "left")
        .join(t3, "user_id", "left")
        .agg(
            F.count("t1").alias("n1"),
            F.count("t2").alias("n2"),
            F.count("t3").alias("n3"),
        )
    )
    one = stages.select(
        F.explode(
            F.array(
                F.struct(F.lit(1).alias("stage"), F.lit("view").alias("step"), F.col("n1").alias("n_users")),
                F.struct(F.lit(2).alias("stage"), F.lit("click_after_view").alias("step"), F.col("n2").alias("n_users")),
                F.struct(F.lit(3).alias("stage"), F.lit("purchase_after_click").alias("step"), F.col("n3").alias("n_users")),
            )
        ).alias("s"),
        F.col("n1"),
    )
    return one.select(
        F.col("s.stage").alias("stage"),
        F.col("s.step").alias("step"),
        F.col("s.n_users").alias("n_users"),
        F.round(F.col("s.n_users") / F.col("n1"), 6).alias("pct_of_step1"),
    ).orderBy("stage")


def funnel_conversion_sql(deadline_hours: int = 24) -> str:
    """DuckDB oracle for :func:`funnel_conversion`, generated from the SAME
    parameter so face and oracle cannot drift when called with a
    non-default deadline (the `_ppl_filter_sql(keep_fraction)` pattern)."""
    h = int(deadline_hours)
    return f"""
WITH t1 AS (
  SELECT user_id, min(CASE WHEN event_type = 'view' THEN ts END) AS t1
  FROM events GROUP BY user_id
),
t2 AS (
  SELECT e.user_id,
         min(CASE WHEN e.event_type = 'click' AND e.ts > t1.t1
                       AND e.ts <= t1.t1 + INTERVAL {h} HOURS
                  THEN e.ts END) AS t2
  FROM events e JOIN t1 ON e.user_id = t1.user_id GROUP BY e.user_id
),
t3 AS (
  SELECT e.user_id,
         min(CASE WHEN e.event_type = 'purchase' AND e.ts > t2.t2
                       AND e.ts <= t2.t2 + INTERVAL {h} HOURS
                  THEN e.ts END) AS t3
  FROM events e JOIN t2 ON e.user_id = t2.user_id GROUP BY e.user_id
),
stages AS (
  SELECT count(t1.t1) AS n1, count(t2.t2) AS n2, count(t3.t3) AS n3
  FROM t1 LEFT JOIN t2 ON t1.user_id = t2.user_id
          LEFT JOIN t3 ON t1.user_id = t3.user_id
)
SELECT v.stage, v.step,
       CASE v.stage WHEN 1 THEN n1 WHEN 2 THEN n2 ELSE n3 END AS n_users,
       round(CASE v.stage WHEN 1 THEN n1 WHEN 2 THEN n2 ELSE n3 END * 1.0 / n1, 6)
         AS pct_of_step1
FROM stages,
     (VALUES (1, 'view'), (2, 'click_after_view'), (3, 'purchase_after_click'))
       AS v(stage, step)
ORDER BY v.stage
"""


FUNNEL_CONVERSION_SQL = funnel_conversion_sql()


def trending_topk(events: DataFrame, k: int = 3) -> DataFrame:
    """Batch face of the streaming trending operator
    (``streaming/trending.py``): event-type counts per OVERLAPPING
    10-minute window sliding every 5 minutes, top-k per window.

    Catalyst's ``window(ts, length, slide)`` explodes each event into its
    length/slide = 2 covering windows, then it is a plain partial-agg
    groupBy; the rank runs per window over the window-count-sized
    aggregate. The oracle reproduces the explode with an explicit
    2-element unnest — pinning the window-assignment semantics the
    streaming twin relies on.

    Output: (w_start, key, cnt, rk).
    """
    counts = (
        events.groupBy(
            F.window(F.col("ts").cast("timestamp"), "10 minutes", "5 minutes").alias("w"),
            F.col("event_type").alias("key"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.unix_micros(F.col("w.start")).alias("w_start"), "key", "cnt")
    )
    w = Window.partitionBy("w_start").orderBy(F.desc("cnt"), F.asc("key"))
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("w_start", "key", "cnt", "rk")
        .orderBy("w_start", "rk")
    )


def trending_topk_sql(k: int = 3) -> str:
    """DuckDB oracle for :func:`trending_topk`, generated from the SAME k
    so face and oracle cannot drift on non-default calls."""
    return f"""
WITH slid AS (
  -- each ts belongs to the 2 sliding windows [start, start + 10min) with
  -- start = slide-aligned bucket minus j slides, j in 0..1
  SELECT ((epoch_us(ts) // 300000000) - j.j) * 300000000 AS w_start,
         event_type AS key
  FROM events, (VALUES (0), (1)) AS j(j)
),
counts AS (
  SELECT w_start, key, count(*) AS cnt FROM slid GROUP BY w_start, key
),
ranked AS (
  SELECT w_start, key, cnt,
         row_number() OVER (PARTITION BY w_start ORDER BY cnt DESC, key ASC) AS rk
  FROM counts
)
SELECT w_start, key, cnt, rk FROM ranked WHERE rk <= {int(k)}
ORDER BY w_start, rk
"""


TRENDING_TOPK_SQL = trending_topk_sql()


def q7_volume_shipping(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    nation_a: str = "NATION_1",
    nation_b: str = "NATION_2",
) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between two nations by ship year.

    Scale: nation is constant-size and joined twice (supplier side,
    customer side) — both forced broadcasts; supplier is small-dim (AQE
    broadcasts); the two fact-sized joins (lineitem|><|orders on orderkey,
    then orders|><|customer on custkey) shuffle on their keys. The
    two-direction nation filter is applied AFTER the cheap broadcast joins
    and prunes before the aggregate. Output is 2 nations x 2 directions x
    years — group-count-sized.
    """
    sn = supplier.join(
        F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    cn = customer.join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
    ).select("c_custkey", F.col("n_name").alias("cust_nation"))
    li = lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    pair = (
        ((F.col("supp_nation") == nation_a) & (F.col("cust_nation") == nation_b))
        | ((F.col("supp_nation") == nation_b) & (F.col("cust_nation") == nation_a))
    )
    return (
        li.join(sn, li.l_suppkey == sn.s_suppkey)
        .join(orders.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cn, F.col("o_custkey") == F.col("c_custkey"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


Q7_SQL = """
SELECT supp_nation, cust_nation, l_year,
       round(sum(volume), 4) AS revenue
FROM (
  SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
         CAST(year(l_shipdate) AS INTEGER) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1998-01-01'
    AND ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
      OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


def q8_market_share(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    part: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    target_nation: str = "NATION_2",
    target_region: str = "ASIA",
    p_type: str = "ECONOMY",
) -> DataFrame:
    """TPC-H Q8 shape: a nation's market share inside one region's market
    for one part type, by order year.

    Scale: region/nation are constant-size broadcasts; part is filtered to
    one p_type BEFORE its fact join (filter pushed to scan); the market
    share is a conditional-sum / sum over the same aggregate — one partial
    agg, group-count-sized output. The customer-region restriction prunes
    via broadcast join, not a post-agg filter.
    """
    rk = region.filter(F.col("r_name") == target_region).select("r_regionkey")
    cn = (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(rk), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    sn = supplier.join(
        F.broadcast(nation.select("n_nationkey", F.col("n_name").alias("supp_nation"))),
        supplier.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", "supp_nation")
    pp = part.filter(F.col("p_type") == p_type).select("p_partkey")
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        lineitem.select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(pp, F.col("l_partkey") == F.col("p_partkey"))
        .join(sn, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cn, F.col("o_custkey") == F.col("c_custkey"))
    )
    tgt = F.when(F.col("supp_nation") == target_nation, vol).otherwise(F.lit(0.0))
    return (
        joined.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(F.round(F.sum(tgt) / F.sum(vol), 6).alias("mkt_share"))
        .orderBy("o_year")
    )


Q8_SQL = """
SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
       round(sum(CASE WHEN sn.n_name = 'NATION_2'
                      THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)
             / sum(l_extendedprice * (1 - l_discount)), 6) AS mkt_share
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN region ON cn.n_regionkey = r_regionkey
WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY o_year
ORDER BY o_year
"""


def q13_customer_distribution(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """TPC-H Q13 shape: distribution of customers by order count (customers
    with zero orders included via left outer join).

    Scale: one shuffle for the per-customer count (orderkey side pre-
    projected to o_custkey only), one for the count-of-counts; both
    partial-aggregable. The reduced schema has no o_comment, so the spec's
    comment filter is omitted (documented divergence).
    """
    per_cust = (
        customer.select("c_custkey")
        .join(orders.select("o_custkey", "o_orderkey"), customer.c_custkey == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


Q13_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q17_small_quantity_revenue(
    lineitem: DataFrame, part: DataFrame, brand: str = "Brand#3", max_size: int = 10
) -> DataFrame:
    """TPC-H Q17 shape: average yearly revenue lost if small-quantity
    orders for one brand's small parts were not filled.

    The spec's correlated subquery (per-part 0.2*avg(l_quantity)) becomes a
    part-keyed aggregate joined back — the standard decorrelation. Scale:
    part is filtered to one brand before anything joins it (broadcast);
    the per-part threshold aggregate runs over the ALREADY part-pruned
    lineitem (semi-join-reduced fact scan), so the corpus-wide groupBy
    never sees unrelated parts. Reduced schema has no p_container; p_size
    stands in as the second predicate.
    """
    pp = part.filter((F.col("p_brand") == brand) & (F.col("p_size") < max_size)).select("p_partkey")
    li = lineitem.select("l_partkey", "l_quantity", "l_extendedprice").join(
        F.broadcast(pp), F.col("l_partkey") == F.col("p_partkey")
    )
    thresh = li.groupBy("l_partkey").agg((0.2 * F.avg("l_quantity")).alias("qty_thresh"))
    return (
        li.join(F.broadcast(thresh.withColumnRenamed("l_partkey", "t_partkey")),
                F.col("l_partkey") == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 4).alias("avg_yearly"),
             F.count(F.lit(1)).alias("n_items"))
    )


Q17_SQL = """
WITH pruned AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#3' AND p_size < 10
),
thresh AS (
  SELECT l_partkey AS t_partkey, 0.2 * avg(l_quantity) AS qty_thresh
  FROM pruned GROUP BY l_partkey
)
SELECT round(sum(l_extendedprice) / 7.0, 4) AS avg_yearly,
       count(*) AS n_items
FROM pruned JOIN thresh ON l_partkey = t_partkey
WHERE l_quantity < qty_thresh
"""


def q18_large_volume_customers(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame, min_qty: int = 300
) -> DataFrame:
    """TPC-H Q18 shape: customers with orders above a total-quantity
    threshold, top 20 by order value.

    The spec's IN-subquery over a grouped HAVING becomes a grouped
    aggregate joined back to orders — Catalyst plans the orderkey-grouped
    sum with map-side partials, and only qualifying orderkeys (a tiny
    frame) join onward to orders/customer. Deterministic top-20 via
    (o_totalprice desc, o_orderkey asc).
    """
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > min_qty)
    )
    return (
        big.join(orders, F.col("l_orderkey") == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .select(
            "c_name", "c_custkey", "o_orderkey",
            F.col("o_orderdate"), F.col("o_totalprice"),
            F.round(F.col("sum_qty"), 2).alias("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


Q18_SQL = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       round(sum_qty, 2) AS sum_qty
FROM (
  SELECT l_orderkey, sum(l_quantity) AS sum_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300
) big
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 20
"""


def q22_dormant_customers(
    customer: DataFrame, orders: DataFrame, since: str = "2000-01-01"
) -> DataFrame:
    """TPC-H Q22 shape: wealthy customers with no RECENT orders, grouped
    by market segment (reduced schema has no c_phone, so c_mktsegment
    stands in for the phone-prefix country grouping; the testdata order
    history covers every customer, so "no orders since `since`" replaces
    the spec's "no orders ever" to keep the face non-vacuous).

    The scalar avg-over-positive-balances subquery becomes a 1-row
    broadcast; the NOT EXISTS becomes a left-anti join on the date-pruned,
    pre-projected o_custkey column (the date filter pushes to the orders
    scan). Integer-cents rounding for the balance sum keeps the
    cross-engine hash exact (merge.py convention: Spark HALF_UP vs DuckDB
    half-even differ on the x.xx5 boundary; cents math never does).
    """
    avg_bal = customer.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    rich = (
        customer.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .select("c_custkey", "c_mktsegment", "c_acctbal")
    )
    recent = orders.filter(
        F.col("o_orderdate") >= F.lit(since).cast("timestamp")
    ).select("o_custkey")
    dormant = rich.join(recent, rich.c_custkey == F.col("o_custkey"), "left_anti")
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    return (
        dormant.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            (F.sum(cents) / 100.0).alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


Q22_SQL = """
WITH avg_bal AS (
  SELECT avg(c_acctbal) AS avg_bal FROM customer WHERE c_acctbal > 0.0
)
SELECT c_mktsegment,
       count(*) AS numcust,
       sum(CAST(round(c_acctbal * 100) AS BIGINT)) / 100.0 AS totacctbal
FROM customer, avg_bal
WHERE c_acctbal > avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


def time_bucket_interpolate(events: DataFrame) -> DataFrame:
    """Hypertable-style gap filling with LINEAR interpolation: hourly mean
    value per event_type over the type's [min, max] hour span; empty
    buckets get the straight line between the surrounding present buckets
    (TimescaleDB's ``interpolate()`` companion to ``locf()``, which
    ``time_bucket_gapfill`` covers).

    Same scale shape as the LOCF face: one combinable shuffle for the
    hourly agg, calendar-sized spine, windows over calendar-sized
    partitions. The interpolation weight divides exact integer epoch
    seconds, so both engines compute identical doubles from identical
    bucket positions. First/last buckets always have data (bounds come
    from the data), so no edge extrapolation is ever needed.
    """
    hour = F.date_trunc("hour", F.col("ts"))
    hourly = events.groupBy(F.col("event_type"), hour.alias("bucket")).agg(
        F.avg("value").alias("v")
    )
    bounds = hourly.groupBy("event_type").agg(
        F.min("bucket").alias("lo"), F.max("bucket").alias("hi")
    )
    spine = bounds.select(
        "event_type",
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias("bucket"),
    )
    joined = spine.join(hourly, ["event_type", "bucket"], "left")
    w = Window.partitionBy("event_type").orderBy("bucket")
    wf = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    ep = F.col("bucket").cast("long")
    prev_v = F.last("v", ignorenulls=True).over(w)
    prev_t = F.last(F.when(F.col("v").isNotNull(), ep), ignorenulls=True).over(w)
    next_v = F.first("v", ignorenulls=True).over(wf)
    next_t = F.first(F.when(F.col("v").isNotNull(), ep), ignorenulls=True).over(wf)
    interp = F.when(F.col("v").isNotNull(), F.col("v")).otherwise(
        prev_v + (next_v - prev_v) * (ep - prev_t) / (next_t - prev_t)
    )
    return joined.select(
        "event_type",
        F.col("bucket").cast("string").alias("bucket"),
        F.col("v").isNotNull().alias("observed"),
        (F.round(interp, 6) + F.lit(0.0)).alias("value"),
    )


TIME_BUCKET_INTERPOLATE_SQL = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket, avg(value) AS v
  FROM events GROUP BY 1, 2
),
bounds AS (
  SELECT event_type, min(bucket) AS lo, max(bucket) AS hi FROM hourly GROUP BY 1
),
spine AS (
  SELECT event_type, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
  FROM bounds
),
j AS (
  SELECT s.event_type, s.bucket, h.v,
         epoch(s.bucket)::BIGINT AS ep
  FROM spine s LEFT JOIN hourly h
    ON h.event_type = s.event_type AND h.bucket = s.bucket
),
filled AS (
  SELECT event_type, bucket, v,
         last_value(v IGNORE NULLS)
           OVER (PARTITION BY event_type ORDER BY bucket) AS prev_v,
         last_value(CASE WHEN v IS NOT NULL THEN ep END IGNORE NULLS)
           OVER (PARTITION BY event_type ORDER BY bucket) AS prev_t,
         first_value(v IGNORE NULLS)
           OVER (PARTITION BY event_type ORDER BY bucket
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
         first_value(CASE WHEN v IS NOT NULL THEN ep END IGNORE NULLS)
           OVER (PARTITION BY event_type ORDER BY bucket
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_t,
         ep
  FROM j
)
SELECT event_type,
       CAST(bucket AS VARCHAR) AS bucket,
       v IS NOT NULL AS observed,
       round(CASE WHEN v IS NOT NULL THEN v
                  ELSE prev_v + (next_v - prev_v) * (ep - prev_t) / (next_t - prev_t)
             END, 6) + 0.0 AS value
FROM filled
"""


def lineitem_stats(lineitem: DataFrame) -> DataFrame:
    """ANALYZE-style per-column statistics in ONE pass: row count, min,
    max, mean, exact distinct count, and null count for the measure
    columns — the stats a cost-based optimizer collects (Spark's own
    ``ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS`` shape, surfaced
    as a queryable face).

    Multiple exact COUNT(DISTINCT) in one aggregate: Catalyst rewrites
    them into a single Expand + two-stage aggregate (one scan, one
    shuffle of the expanded distinct keys) — no per-column re-scans.
    Output: one row per column, long format.
    """
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [
            F.min(c).alias(f"{c}_min"),
            F.max(c).alias(f"{c}_max"),
            (F.round(F.avg(c), 6) + F.lit(0.0)).alias(f"{c}_avg"),
            F.count_distinct(F.col(c)).alias(f"{c}_ndv"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}_nulls"),
        ]
    wide = lineitem.agg(*aggs)
    rows = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.col("n_rows").alias("n_rows"),
            F.col(f"{c}_min").cast("double").alias("min_val"),
            F.col(f"{c}_max").cast("double").alias("max_val"),
            F.col(f"{c}_avg").alias("avg_val"),
            F.col(f"{c}_ndv").alias("ndv"),
            F.col(f"{c}_nulls").cast("bigint").alias("n_nulls"),
        )
        for c in cols
    ]
    return (
        wide.select(F.explode(F.array(*rows)).alias("s"))
        .select("s.*")
        .orderBy("col_name")
    )


LINEITEM_STATS_SQL = """
WITH wide AS (
  SELECT count(*) AS n_rows,
         min(l_quantity) AS q_min, max(l_quantity) AS q_max,
         round(avg(l_quantity), 6) + 0.0 AS q_avg,
         count(DISTINCT l_quantity) AS q_ndv,
         sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS q_nulls,
         min(l_extendedprice) AS p_min, max(l_extendedprice) AS p_max,
         round(avg(l_extendedprice), 6) + 0.0 AS p_avg,
         count(DISTINCT l_extendedprice) AS p_ndv,
         sum(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END) AS p_nulls,
         min(l_discount) AS d_min, max(l_discount) AS d_max,
         round(avg(l_discount), 6) + 0.0 AS d_avg,
         count(DISTINCT l_discount) AS d_ndv,
         sum(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END) AS d_nulls
  FROM lineitem
)
SELECT 'l_discount' AS col_name, n_rows,
       d_min::DOUBLE AS min_val, d_max::DOUBLE AS max_val, d_avg AS avg_val,
       d_ndv::BIGINT AS ndv, d_nulls::BIGINT AS n_nulls FROM wide
UNION ALL
SELECT 'l_extendedprice', n_rows, p_min::DOUBLE, p_max::DOUBLE, p_avg,
       p_ndv::BIGINT, p_nulls::BIGINT FROM wide
UNION ALL
SELECT 'l_quantity', n_rows, q_min::DOUBLE, q_max::DOUBLE, q_avg,
       q_ndv::BIGINT, q_nulls::BIGINT FROM wide
ORDER BY col_name
"""
