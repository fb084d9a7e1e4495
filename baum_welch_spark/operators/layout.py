"""Data-layout operators: Z-order (Morton) clustering for multi-dimensional
data-skipping — the file-layout optimization behind Delta/Iceberg OPTIMIZE
ZORDER, re-expressed as plain Catalyst columns plus a range-partitioned
sorted write.

Why it matters at 100 TB: parquet min/max footer stats prune files only when
rows with nearby values are physically co-located. A sort on (x) clusters x
but scatters y; interleaving the bits of both keys gives every file a small
bounding box in BOTH dimensions, so a predicate on either (or both) column
prunes most files. The z-value computation is a shuffle-free projection; the
layout write is one range shuffle on the z-key.

The bit math uses only >>, &, <<, + on non-negative bounded ints, so the
whole operator has a DuckDB-exact oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bits per dimension (two dims -> z-values fit in 2*ZBITS <= 62 bits)
ZBITS = 16


def _bin_expr(col: Column, cmin: Column, cmax: Column, bits: int) -> Column:
    """Map a numeric column into [0, 2^bits) by linear scaling over the
    observed [min, max] range (max maps to the top bucket)."""
    nb = F.lit(float(1 << bits))
    span = (cmax - cmin).cast("double")
    scaled = F.when(span > 0, (col - cmin).cast("double") / span * nb).otherwise(F.lit(0.0))
    return F.least(F.floor(scaled), F.lit((1 << bits) - 1)).cast("bigint")


def _interleave(xbin: str, ybin: str, bits: int) -> Column:
    """Morton-interleave two ``bits``-wide ints: x takes even bit positions,
    y odd. Runtime fold (SQL ``aggregate``) instead of a 2*bits-term
    unrolled expression tree — compact plan, same codegen arithmetic."""
    return F.expr(
        f"aggregate(sequence(0, {bits - 1}), 0L, (acc, b) -> "
        f"acc + shiftleft(shiftright({xbin}, b) & 1, 2 * b)"
        f"    + shiftleft(shiftright({ybin}, b) & 1, 2 * b + 1))"
    )


def zorder_key(
    df: DataFrame, xcol: str, ycol: str, id_cols: list[str], bits: int = ZBITS
) -> DataFrame:
    """Project each row to its Z-order key over (``xcol``, ``ycol``).

    Output: (*id_cols, xbin, ybin, zval). The min/max range pass is a
    1-row combinable aggregate broadcast back (the same two-pass shape as
    any normalization); the projection itself never shuffles.
    """
    rng = df.agg(
        F.min(xcol).alias("xmin"),
        F.max(xcol).alias("xmax"),
        F.min(ycol).alias("ymin"),
        F.max(ycol).alias("ymax"),
    )
    binned = (
        df.join(F.broadcast(rng), how="cross")
        .select(
            *id_cols,
            _bin_expr(F.col(xcol), F.col("xmin"), F.col("xmax"), bits).alias("xbin"),
            _bin_expr(F.col(ycol), F.col("ymin"), F.col("ymax"), bits).alias("ybin"),
        )
        .withColumn("zval", _interleave("xbin", "ybin", bits))
    )
    return binned


def zorder_events(events: DataFrame) -> DataFrame:
    """Driver-contract face: z-keys for events over (user_id, value) —
    the two columns ad-hoc event queries filter on. Ordered output so the
    layout (not just the key math) is part of the checked contract."""
    out = zorder_key(events, "user_id", "value", ["event_id"])
    return out.select("event_id", "xbin", "ybin", "zval").orderBy("zval", "event_id")


def write_zordered(
    df: DataFrame, path: str, xcol: str, ycol: str, id_cols: list[str], n_files: int = 64
) -> None:
    """Materialize the z-ordered layout: range-partition on zval (files get
    contiguous z-ranges == small 2-D bounding boxes) and sort within each
    partition so parquet row-group stats are tight too."""
    keyed = zorder_key(df, xcol, ycol, id_cols)
    joined = df.join(keyed.select(*id_cols, "zval"), id_cols)
    (
        joined.repartitionByRange(n_files, "zval")
        .sortWithinPartitions("zval")
        .write.mode("overwrite")
        .parquet(path)
    )


ZORDER_EVENTS_SQL = f"""
WITH rng AS (
  SELECT min(user_id) AS xmin, max(user_id) AS xmax,
         min(value) AS ymin, max(value) AS ymax
  FROM events
),
binned AS (
  SELECT e.event_id,
         CAST(least(floor(CASE WHEN r.xmax > r.xmin
             THEN (e.user_id - r.xmin) * 1.0 / (r.xmax - r.xmin) * {1 << ZBITS}
             ELSE 0.0 END), {(1 << ZBITS) - 1}) AS BIGINT) AS xbin,
         CAST(least(floor(CASE WHEN r.ymax > r.ymin
             THEN (e.value - r.ymin) * 1.0 / (r.ymax - r.ymin) * {1 << ZBITS}
             ELSE 0.0 END), {(1 << ZBITS) - 1}) AS BIGINT) AS ybin
  FROM events e CROSS JOIN rng r
)
SELECT event_id, xbin, ybin,
       (SELECT sum((((xbin >> b) & 1) << (2 * b)) + (((ybin >> b) & 1) << (2 * b + 1)))
        FROM unnest(generate_series(0, {ZBITS - 1})) AS t(b))::BIGINT AS zval
FROM binned
ORDER BY zval, event_id
"""
