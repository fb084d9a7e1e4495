"""Build the observation-sequence corpus from the ``events`` table.

Reference input: SequenceFile of ``(LongWritable seqID, IntArrayWritable obs)``
(BaumWelchMapper.java:44-45, IntArrayWritable.java:24-29). Our corpus is
derived relationally: group events by entity, order by time, dense-code the
categorical symbol column (SURVEY §1.3).

Scale notes: the symbol dictionary is a distinct over a low-cardinality
column (event types), so the single-partition dense-rank window touches only
|vocab| rows; the join back is an automatic broadcast. The groupBy(entity)
shuffle partitions by entity key — at 100 TB this is the natural partitioning
(sequences are independent downstream, so no further shuffle is needed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SEQUENCES_SCHEMA = "seq_id bigint, obs array<int>"


def symbol_dictionary(
    events: DataFrame, symbol_col: str = "event_type"
) -> DataFrame:
    """Dense 0-based integer coding of the categorical symbol column,
    deterministic by lexicographic order.

    The reference ships state-name dictionaries via DistributedCache
    (MapWritableCache.java:49-109, BaumWelchMapper.java:61-63); here the
    dictionary is a first-class 2-column DataFrame, broadcast-joined when
    encoding and collectable to a plain dict for decoding.
    """
    w = Window.orderBy(symbol_col)  # vocab-sized input; single partition is fine
    return (
        events.select(symbol_col).distinct()
        .withColumn("sym", (F.dense_rank().over(w) - F.lit(1)).cast("int"))
    )


def symbol_dict(events: DataFrame, symbol_col: str = "event_type") -> dict[str, int]:
    """Collect the dictionary to a plain dict (broadcast side-data form, S5)."""
    return {r[symbol_col]: r["sym"] for r in symbol_dictionary(events, symbol_col).collect()}


def build_sequences(
    events: DataFrame,
    entity_col: str = "user_id",
    symbol_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """events -> sequences(seq_id bigint, obs array<int>).

    Ordering within a sequence is (ts, tiebreak) — total, so the result is
    deterministic under any partitioning. Implemented as
    collect_list(struct) + array_sort + transform, which keeps the whole
    pipeline in Catalyst (one shuffle, map-side partial aggregation applies).
    """
    dict_df = symbol_dictionary(events, symbol_col)
    coded = events.join(F.broadcast(dict_df), symbol_col)
    return (
        coded.groupBy(F.col(entity_col).cast("bigint").alias("seq_id"))
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col(ts_col), F.col(tiebreak_col), F.col("sym")))
                ),
                lambda x: x["sym"],
            ).alias("obs")
        )
    )
