"""Sequential time-series smoothing: per-key exponentially weighted moving
average (EWMA) — the recursive-state window op that plain SQL window frames
cannot express (each output depends on the PREVIOUS OUTPUT, not a data
frame), completing the time-series family next to the frame-expressible
``daily_revenue_ma7`` / ``rolling_user_spend`` / gap-fill ops.

The reference has no time-series surface (SURVEY §2.5); beyond-reference
§2.7, same role TimescaleDB's ``ewma`` / Flink's stateful process function
play.

Scale posture (100 TB events):

- The daily pre-aggregation is ONE shuffled groupBy (map-side partial) that
  collapses the corpus to (keys x days) rows — everything after is
  key-sized, not event-sized.
- The recursion itself is the textbook irreducible dependency chain: y_t
  needs y_{t-1}, so work parallelizes ACROSS keys (``applyInPandas`` over
  the user partition — millions of independent chains on a 1000-executor
  cluster) and is strictly sequential WITHIN one key, which is O(days) with
  O(1) state. A per-key day count that itself overflows one task means
  chunking by time range and stitching boundary states — out of scope for
  the face, documented here as the scale escape hatch.
- The Arrow batch carries only (day, spend) pairs per key: KB-scale groups.

Exactness: both engines replay the SAME recursion order (by day within
key), and each step is two literal-coefficient multiplies + one add in
IEEE double — bit-identical given identical daily inputs; the daily sums
are 4-dp-rounded first (the committed accepted class: a cross-engine
rounding flip needs ~1e-12 luck on the sum). The EWMA itself is emitted
UNROUNDED — the one face where rounding would HURT: alpha=0.5 halvings
of 4-dp inputs land on exact decimal-halfway values (x.xxxxx65 with the
unrounded value exactly ...6250000) all the time, where Spark's
BigDecimal HALF_UP and DuckDB's multiply-based round disagree — measured
at sf0.001: 1 flip in 159 rows at 6 dp. The raw doubles are bit-equal.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: driver-contract smoothing factor; 0.5 keeps every multiply EXACT in IEEE
#: double (x0.5 is a pure exponent decrement), so the recursion is
#: bit-stable even against summation-order paranoia
EWMA_ALPHA = 0.5


def ewma_user_spend(events: DataFrame, alpha: float = EWMA_ALPHA) -> DataFrame:
    """Per-user EWMA of daily purchase spend.

    ``y_1 = x_1``; ``y_t = (1 - alpha) * y_{t-1} + alpha * x_t`` over each
    user's day-ordered daily spend (purchases only, daily sums rounded to
    4 dp like the other revenue faces).

    Output: ``(user_id, day, spend, ewma_spend)`` ordered by (user_id, day),
    ``ewma_spend`` unrounded (see the module docstring: the raw recursion is
    bit-identical across engines; rounding is what would diverge).

    NULL convention (ADVICE r11): a day whose purchase values are ALL NULL
    sums to NULL in both engines; without a defined value it would become
    NaN in the float64 recursion here (poisoning every later ewma for the
    user) while DuckDB keeps NULL and the streaming twin emits 0.0 (its
    accumulator skips NULLs, so an all-NULL day leaves accum at 0.0). All
    three now agree by coalescing the daily sum to 0.0 — batch here, the
    oracle via COALESCE, and the stream by construction.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    daily = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy(
            "user_id",
            F.date_trunc("day", F.col("ts")).cast("date").cast("string").alias("day"),
        )
        .agg(F.coalesce(F.round(F.sum("value"), 4), F.lit(0.0)).alias("spend"))
    )
    one_minus = 1.0 - alpha

    # Partition-wise recursion instead of groupBy().applyInPandas (guide
    # §4.2/§4.5): the per-key chains are KB-scale, so per-GROUP pandas
    # dispatch (one DataFrame construction + one Arrow batch per key)
    # dominated the face — ~1500 tiny groups cost ~8 s of pure overhead at
    # sf0.1 where one pass over the same 16k daily rows is milliseconds.
    # Hash-partition by user, sort (user, day) within each partition, and
    # run ONE vectorized pass per Arrow batch, carrying (last_uid, last_y)
    # across batch boundaries inside the partition (a key's chain can
    # straddle batches; batches of one partition arrive in order). The
    # recursion's op sequence per key is unchanged — two literal-coefficient
    # multiplies + one add on float64, in day order — so the output stays
    # bit-identical to the oracle's recursive CTE. Day strings sort
    # lexicographically == chronologically (YYYY-MM-DD), exactly like the
    # old per-group sort_values("day").
    def ewma_partition(pdfs):
        last_uid, last_y = None, 0.0
        for pdf in pdfs:
            uids = pdf["user_id"].to_numpy()
            x = pdf["spend"].to_numpy(dtype="float64")
            y = x.copy()
            for t in range(len(y)):
                if uids[t] == last_uid:
                    y[t] = one_minus * last_y + alpha * x[t]
                last_uid, last_y = uids[t], y[t]
            out = pdf[["user_id", "day", "spend"]].copy()
            out["ewma_spend"] = y
            yield out

    return (
        daily.repartition("user_id")
        .sortWithinPartitions("user_id", "day")
        .mapInPandas(
            ewma_partition,
            schema="user_id bigint, day string, spend double, ewma_spend double",
        )
        .orderBy("user_id", "day")
    )


def ewma_user_spend_sql(alpha: float = EWMA_ALPHA) -> str:
    """DuckDB oracle for :func:`ewma_user_spend`: the same recursion as a
    recursive CTE walking each user's day-rank chain (this one IS
    recursive-CTE-expressible — each step touches one prior row, no
    aggregate over the recursive reference). Coefficients are embedded as
    full-precision ``repr`` literals cast through DOUBLE (the committed
    inline-literal trick), so each step runs the identical IEEE ops.
    """
    a = repr(float(alpha))
    om = repr(1.0 - float(alpha))
    return f"""
WITH RECURSIVE daily AS (
  SELECT user_id,
         CAST(CAST(date_trunc('day', ts) AS DATE) AS VARCHAR) AS day,
         coalesce(round(sum(value), 4), 0.0) AS spend
  FROM events
  WHERE event_type = 'purchase'
  GROUP BY 1, 2
),
seq AS (
  SELECT user_id, day, spend,
         row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn
  FROM daily
),
r AS (
  SELECT user_id, day, spend, rn, spend AS ewma
  FROM seq WHERE rn = 1
  UNION ALL
  SELECT s.user_id, s.day, s.spend, s.rn,
         CAST('{om}' AS DOUBLE) * r.ewma + CAST('{a}' AS DOUBLE) * s.spend
  FROM r JOIN seq s ON s.user_id = r.user_id AND s.rn = r.rn + 1
)
SELECT user_id, day, spend, ewma AS ewma_spend
FROM r
ORDER BY user_id, day
"""


#: the face's oracle (driver-contract parameters)
EWMA_USER_SPEND_SQL = ewma_user_spend_sql()
