"""Skew-aware shuffle patterns: salted aggregation and salted joins.

The reference shuffles all stripes to at most 2N+1 distinct Text keys
(`BaumWelchDriver.java:163-166`, SURVEY §2.3 A1) — with N=4 hidden states
that is 9 reducer keys for the whole corpus, the canonical skew disaster at
cluster scale. Our engine's E-step avoids it structurally (in-UDF combine +
Catalyst partial aggregation), but a general engine still needs explicit
skew tools for hot keys the optimizer can't see. Two standard patterns:

  * ``salted_agg``  — two-phase aggregation: spread each group over
    ``n_salt`` sub-groups keyed by a hash of a high-cardinality spread
    column, partially aggregate, then merge. First shuffle carries
    ``n_salt`` rows per hot key instead of every record; second shuffle is
    tiny. Only valid for mergeable aggregates (sum/count/min/max — the
    algebraic ones, exactly what Catalyst partial agg exploits).
  * ``salted_join`` — replicate the small side over all salt values and
    salt the big side's key by row hash, turning one hot join key into
    ``n_salt`` evenly loaded keys. (Spark's AQE skew-join splits oversized
    *partitions* at runtime; explicit salting also fixes single-KEY
    hotspots, which partition splitting cannot.)

Both produce results identical to their unsalted forms — asserted by tests
and by the DuckDB oracle on the unsalted SQL.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT = "__salt"


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    spread_col: str,
    aggs: dict[str, tuple[str, str]],
    n_salt: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output column -> (fn, input column) with fn in
    {sum, count, min, max}. count is re-aggregated with sum in phase 2.
    """
    phase1_exprs = []
    phase2_exprs = []
    for out, (fn, col) in aggs.items():
        if fn == "count":
            phase1_exprs.append(F.count(col).alias(out))
            phase2_exprs.append(F.sum(out).alias(out))
        elif fn in ("sum", "min", "max"):
            f = getattr(F, fn)
            phase1_exprs.append(f(col).alias(out))
            phase2_exprs.append(f(out).alias(out))
        else:
            raise ValueError(f"non-mergeable aggregate: {fn}")
    salted = df.withColumn(SALT, F.pmod(F.hash(spread_col), F.lit(n_salt)))
    partial = salted.groupBy(*keys, SALT).agg(*phase1_exprs)
    return partial.groupBy(*keys).agg(*phase2_exprs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big`` to ``small`` on ``key`` with the small side
    replicated ``n_salt`` times, so a hot key spreads over ``n_salt``
    shuffle partitions. Output columns = big's then small's (minus its key).

    ``how`` must preserve big-side multiplicity only: 'inner', 'left',
    'left_semi', or 'left_anti'. 'right'/'full' outer joins are rejected —
    an unmatched small-side row exists ``n_salt`` times after replication,
    so an outer join would emit it ``n_salt`` duplicate times.
    """
    allowed = {"inner", "left", "leftouter", "left_outer", "left_semi", "leftsemi", "left_anti", "leftanti", "semi", "anti"}
    if how not in allowed:
        raise ValueError(
            f"salted_join supports {sorted(allowed)} only; {how!r} would "
            f"duplicate unmatched small-side rows n_salt={n_salt} times"
        )
    salted_big = big.withColumn(SALT, F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(n_salt)))
    replicated = small.withColumn(
        SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    ).withColumnRenamed(key, f"__{key}_r")
    joined = salted_big.join(
        replicated,
        (F.col(key) == F.col(f"__{key}_r")) & (salted_big[SALT] == replicated[SALT]),
        how,
    )
    return joined.drop(SALT).drop(f"__{key}_r")


def user_value_stats_salted(events: DataFrame, n_salt: int = 16) -> DataFrame:
    """Per event_type value stats via salted two-phase agg — identical to the
    plain groupBy (the DuckDB oracle below runs the unsalted SQL). The
    spread column is event_id (unique, so sub-groups are uniform)."""
    out = salted_agg(
        events,
        keys=["event_type"],
        spread_col="event_id",
        aggs={
            "n_events": ("count", "event_id"),
            "total_value": ("sum", "value"),
            "min_value": ("min", "value"),
            "max_value": ("max", "value"),
        },
        n_salt=n_salt,
    )
    return out.select(
        "event_type",
        "n_events",
        F.round("total_value", 4).alias("total_value"),
        F.round("min_value", 6).alias("min_value"),
        F.round("max_value", 6).alias("max_value"),
    ).orderBy("event_type")


USER_VALUE_STATS_SALTED_SQL = """
SELECT event_type,
       count(event_id) AS n_events,
       round(sum(value), 4) AS total_value,
       round(min(value), 6) AS min_value,
       round(max(value), 6) AS max_value
FROM events GROUP BY event_type ORDER BY event_type
"""


def segment_value_stats_salted_join(
    events: DataFrame, customer: DataFrame, n_salt: int = 16
) -> DataFrame:
    """Event value stats per customer market segment via ``salted_join`` —
    the skew-join face: events is the big side (user_id is the join key and
    the synthetic generator makes low ids hot), customer the replicated
    small side. Result is identical to the plain join (the DuckDB oracle
    runs the unsalted SQL)."""
    big = events.select(F.col("user_id").alias("c_custkey"), "value")
    joined = salted_join(
        big, customer.select("c_custkey", "c_mktsegment"), key="c_custkey", n_salt=n_salt
    )
    return (
        joined.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .orderBy("c_mktsegment")
    )


SEGMENT_VALUE_STATS_SQL = """
SELECT c_mktsegment,
       count(*) AS n_events,
       round(sum(value), 4) AS total_value
FROM events JOIN customer ON user_id = c_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


def skew_report(df: DataFrame, key_cols: Sequence[str], p: float = 0.99) -> DataFrame:
    """Per-key-column skew diagnostic: the measurement that DECIDES between
    a plain shuffle, ``salted_agg``/``salted_join``, and AQE skew-join —
    at 100 TB you profile the key distribution before burning a cluster-day
    on a join that one hot key serializes.

    One output row per candidate key column:

    - ``n_rows`` / ``n_keys`` — population and cardinality;
    - ``max_count`` and ``pXX_count`` (exact interpolated percentile of the
      per-key counts) — the hot-key mass;
    - ``skew_ratio`` = max_count / mean_count — 1.0 is perfectly uniform;
      the classic rule of thumb salts anything above ~an order of magnitude;
    - ``top_key`` / ``top_count`` / ``top_share`` — the single hottest key
      (ties broken by min key string, so the row is deterministic and the
      face DuckDB-exact; NULL keys count as the sentinel string ``<NULL>``
      so both engines group and order them identically — an in-band
      sentinel, so a column whose LEGITIMATE values include the literal
      string ``<NULL>`` merges those rows with the true NULLs; pick key
      columns accordingly).

    Plan: per column one map-side-combined count shuffle (the same shape the
    eventual aggregation would take, so profiling cost ~= one pass of the
    real job's first phase) and one all-to-one summary agg over the
    key-cardinality-sized counts frame; columns are a plan-level union, not
    a driver loop. The exact percentile sorts the counts frame — swap
    ``F.percentile_approx`` here when key cardinality itself is data-sized
    (same trade documented and tested for ``anomaly.mad_outliers``).
    """
    if not key_cols:
        raise ValueError("key_cols must name at least one column")
    parts = []
    for kc in key_cols:
        # NULL keys fold into one sentinel group: Spark's struct-min tiebreak
        # and DuckDB's ORDER BY ... NULLS LAST order NULL differently, so a
        # NULL top_key would break the claimed DuckDB-exactness — and a NULL
        # group is exactly the hot key the report must surface, not hide
        counts = df.groupBy(
            F.coalesce(F.col(kc).cast("string"), F.lit("<NULL>")).alias("k")
        ).agg(F.count(F.lit(1)).alias("cnt"))
        # min over (-cnt, key) == (max count, tie -> min key): one combinable
        # agg instead of a window or a second ordered pass
        top = F.min(F.struct((-F.col("cnt")).alias("neg"), F.col("k"))).alias("t")
        parts.append(
            counts.agg(
                F.sum("cnt").alias("n_rows"),
                F.count(F.lit(1)).alias("n_keys"),
                F.max("cnt").alias("max_count"),
                F.round(F.percentile("cnt", F.lit(p)), 6).alias("p_count"),
                top,
            ).select(
                F.lit(kc).alias("key_col"),
                "n_rows",
                "n_keys",
                "max_count",
                "p_count",
                F.round(
                    F.col("max_count") * F.col("n_keys") / F.col("n_rows"), 6
                ).alias("skew_ratio"),
                F.col("t.k").alias("top_key"),
                (-F.col("t.neg")).alias("top_count"),
                F.round(-F.col("t.neg") / F.col("n_rows"), 6).alias("top_share"),
            )
        )
    out = parts[0]
    for part in parts[1:]:
        out = out.unionByName(part)
    return out.orderBy("key_col")


def skew_report_sql(table: str, key_cols: Sequence[str], p: float = 0.99) -> str:
    """DuckDB-exact oracle for :func:`skew_report`: per-column count CTE,
    ``quantile_cont`` (same linear interpolation as Spark's ``percentile``),
    and an ORDER BY-LIMIT scalar pair for the deterministic top key."""
    selects = []
    for kc in key_cols:
        selects.append(
            f"""(
  WITH c AS (SELECT coalesce({kc}::VARCHAR, '<NULL>') AS k, count(*) AS cnt
             FROM {table} GROUP BY 1)
  SELECT '{kc}' AS key_col,
         CAST(sum(cnt) AS BIGINT) AS n_rows,  -- HUGEINT floats the dtype kind
         count(*) AS n_keys,
         max(cnt) AS max_count,
         round(quantile_cont(cnt, {p}), 6) AS p_count,
         round(max(cnt) * count(*) * 1.0 / sum(cnt), 6) AS skew_ratio,
         (SELECT k FROM c ORDER BY cnt DESC, k ASC LIMIT 1) AS top_key,
         (SELECT cnt FROM c ORDER BY cnt DESC, k ASC LIMIT 1) AS top_count,
         round((SELECT cnt FROM c ORDER BY cnt DESC, k ASC LIMIT 1) * 1.0
               / sum(cnt), 6) AS top_share
  FROM c
)"""
        )
    return "\nUNION ALL\n".join(selects) + "\nORDER BY key_col"
