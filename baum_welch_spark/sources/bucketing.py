"""Bucketed tables: pre-shuffled storage for co-located, exchange-free joins.

At 100 TB the dominant cost of a fact-to-fact equi-join (e.g. orders ⋈
lineitem on orderkey) is the shuffle of both sides. Bucketing pays that
shuffle ONCE at write time: both tables are hash-partitioned into the same
number of buckets on the join key and each bucket is sorted, so every
subsequent join planned over them is a zero-Exchange sort-merge join —
Catalyst sees the matching `HashPartitioning(key, n)` output partitioning
on both scans and elides both exchanges (and with sorted buckets, both
sorts). The same applies to groupBy on the bucket key.

This is Spark's equivalent of the co-partitioned-storage trick classic MPP
engines use; the reference has nothing comparable (single fixed dataflow,
SURVEY §4). Tests assert the executed plan has zero shuffles and that
results equal the plain-join results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int,
    path: str,
    sort: bool = True,
) -> None:
    """Persist ``df`` as an external parquet table bucketed (and bucket-
    sorted) on ``bucket_col``. Both sides of a future co-located join must
    use the SAME ``n_buckets``."""
    w = df.write.bucketBy(n_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.option("path", path).mode("overwrite").format("parquet").saveAsTable(table_name)


def cobucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucket-count tables on their bucket column. With
    bucketing metadata present, Catalyst plans this without any Exchange."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str]) -> None:
    """Hive-style partitioned parquet layout (``path/col=value/...``).

    The partition column becomes directory structure, so filters on it never
    touch non-matching files at all (partition pruning — visible as
    PartitionFilters in the scan, distinct from row-group predicate
    pushdown). The right layout for time-series at 100 TB: a day filter
    prunes 364/365ths of the input before a single byte is read.
    """
    df.write.partitionBy(*partition_cols).mode("overwrite").parquet(path)
