"""Schema-pinned readers for the engine's tables.

The reference reads SequenceFiles with compiled-in Writable schemas
(BaumWelchDriver.java:168, IntArrayWritable.java:24-29); our analogue is
Parquet with explicitly normalized column types — never schema inference
for the core tables (SURVEY §1.3).

The driver testdata stores timestamps as Parquet INT64 TIMESTAMP(NANOS),
which Spark only reads with ``spark.sql.legacy.parquet.nanosAsLong=true``
(arriving as bigint nanos). ``load_table`` converts those columns back to
timestamps via integer ``div 1000`` — truncation to microseconds, exactly
what DuckDB does when reading the same files, so oracle comparisons agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# timestamp columns per table (stored as nanos in the testdata parquet)
_TS_COLS = {
    "events": ["ts"],
    "orders": ["o_orderdate"],
    "lineitem": ["l_shipdate"],
}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for c in _TS_COLS.get(name, []):
        if isinstance(df.schema[c].dataType, T.LongType):
            df = df.withColumn(c, F.expr(f"timestamp_micros({c} div 1000)"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}
