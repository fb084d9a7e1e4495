"""Schema-pinned readers for the engine's tables.

The reference reads SequenceFiles with compiled-in Writable schemas
(BaumWelchDriver.java:168, IntArrayWritable.java:24-29); our analogue is
Parquet with explicitly normalized column types — never schema inference
for the core tables (SURVEY §1.3).

Driver testdata timestamp encodings have varied by round — INT64
TIMESTAMP(NANOS) (readable only via ``spark.sql.legacy.parquet.nanosAsLong``,
arriving as bigint nanos) and TIMESTAMP(MICROS) without UTC adjustment
(arriving as TIMESTAMP_NTZ). ``load_table`` normalizes either to a plain
UTC TIMESTAMP column: nanos are integer-``div 1000``-truncated (exactly
DuckDB's read of the same file) and NTZ is reinterpreted as UTC (the session
zone is pinned to UTC first, so the cast is value-preserving — identical to
DuckDB's naive reading). Downstream operators can therefore always rely on
``unix_micros(ts)`` working and agreeing with the DuckDB oracle's epoch.
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
    # self-sufficient under ANY session (e.g. a driver-owned one without our
    # session.py defaults): without nanosAsLong, reading the testdata's
    # TIMESTAMP(NANOS) columns throws PARQUET_TYPE_ILLEGAL outright, and a
    # non-UTC session timezone would shift date-derived results away from
    # the (UTC-naive) DuckDB oracle. Both are runtime-settable SQL confs.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for c in _TS_COLS.get(name, []):
        dt = df.schema[c].dataType
        if isinstance(dt, T.LongType):
            df = df.withColumn(c, F.expr(f"timestamp_micros({c} div 1000)"))
        elif isinstance(dt, T.TimestampNTZType):
            # session zone is UTC (set above) so this cast reinterprets the
            # naive value as the same UTC instant — no shift
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


# -- multi-format sinks/sources ---------------------------------------------
#
# The reference supports exactly one format (SequenceFile, SURVEY §2.1
# S1-S3); a usable engine needs the interchange formats too. Parquet/ORC are
# the columnar paths (pushdown + pruning); CSV/JSON are row formats for
# interchange — schema-pinned on read (never inferred), timestamps written
# with explicit microsecond format so round-trips are lossless.

FORMATS = ("parquet", "orc", "json", "csv")
_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def _format_options(fmt: str) -> dict[str, str]:
    if fmt == "csv":
        return {"header": "true", "timestampFormat": _TS_FMT}
    if fmt == "json":
        return {"timestampFormat": _TS_FMT}
    return {}


def write_table(df: DataFrame, path: str, fmt: str = "parquet", mode: str = "overwrite") -> None:
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {FORMATS}")
    if fmt == "csv":
        bad = [f.name for f in df.schema.fields
               if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType, T.BinaryType))]
        if bad:
            raise ValueError(f"CSV cannot hold nested/binary columns: {bad}; use parquet/orc/json")
    df.write.format(fmt).options(**_format_options(fmt)).mode(mode).save(path)


def read_table(spark: SparkSession, path: str, fmt: str, schema: T.StructType) -> DataFrame:
    """Schema-pinned read (SURVEY §1.3: the engine never infers core-table
    schemas — the Writable-class discipline, kept)."""
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {FORMATS}")
    return (
        spark.read.format(fmt).options(**_format_options(fmt)).schema(schema).load(path)
    )


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every core table as a temp view so the whole engine surface
    is reachable from plain ``spark.sql`` — the SQL face of the API
    (DuckDB-oracle SQL in the driver contract runs near-verbatim here).

    Also registers the DERIVED ``partsupp`` view (operators/partsupp.py,
    r12): a deterministic pure function of part x supplier, so the full
    22-query TPC-H surface runs through the SQL door with no extra
    fixture — generated-on-read, never materialized."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    from baum_welch_spark.operators.partsupp import derive_partsupp

    derive_partsupp(
        spark.table("part"), spark.table("supplier")
    ).createOrReplaceTempView("partsupp")
