"""Bucketed-table tests: the co-located join must execute with ZERO
shuffles and produce exactly the plain-join result."""

import pytest
from pyspark.sql import functions as F

from baum_welch_spark.plans.audit import plan_report
from baum_welch_spark.sources.bucketing import cobucketed_join, write_bucketed
from baum_welch_spark.sources.io import load_table

from conftest import SF0001


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    orders = load_table(spark, SF0001, "orders")
    lineitem = load_table(spark, SF0001, "lineitem")
    write_bucketed(orders, "orders_b", "o_orderkey", 8, str(base / "orders_b"))
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "lineitem_b",
        "o_orderkey",
        8,
        str(base / "lineitem_b"),
    )
    yield "orders_b", "lineitem_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_cobucketed_join_zero_shuffles(spark, bucketed_tables):
    left, right = bucketed_tables
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = cobucketed_join(spark, left, right, "o_orderkey").select(
            "o_orderkey", "o_totalprice", "l_extendedprice"
        )
        rep = plan_report(joined)
        assert rep["shuffles"] == 0, rep
        assert rep["sortmerge_joins"] == 1, rep
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_cobucketed_join_matches_plain_join(spark, bucketed_tables):
    left, right = bucketed_tables
    got = (
        cobucketed_join(spark, left, right, "o_orderkey")
        .groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_extendedprice"), 4).alias("rev"))
    )
    orders = load_table(spark, SF0001, "orders")
    lineitem = load_table(spark, SF0001, "lineitem")
    plain = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_extendedprice"), 4).alias("rev"))
    )
    a = {(r.o_orderkey, r.n, r.rev) for r in got.collect()}
    b = {(r.o_orderkey, r.n, r.rev) for r in plain.collect()}
    assert a == b and len(a) > 0


def test_bucketed_groupby_on_bucket_key_zero_shuffles(spark, bucketed_tables):
    left, _ = bucketed_tables
    agg = spark.table(left).groupBy("o_orderkey").agg(F.sum("o_totalprice").alias("t"))
    rep = plan_report(agg)
    assert rep["shuffles"] == 0, rep


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    from baum_welch_spark.plans.audit import explain_str
    from baum_welch_spark.sources.bucketing import write_partitioned

    events = load_table(spark, SF0001, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    path = str(tmp_path / "events_by_day")
    write_partitioned(events, path, ["day"])
    back = spark.read.parquet(path)
    # partition-column values come back type-inferred (string day -> date)
    days = sorted(str(r.day) for r in back.select("day").distinct().collect())
    assert len(days) > 1
    one = back.filter(F.col("day") == days[0])
    formatted = explain_str(one, "formatted")
    assert "PartitionFilters" in formatted and days[0] not in formatted.split("PartitionFilters")[0]
    # pruned scan reads only that day's rows
    expect = events.filter(F.col("day") == days[0]).count()
    assert one.count() == expect > 0


def test_register_views_sql_face(spark):
    from baum_welch_spark.sources.io import register_views

    register_views(spark, SF0001)
    n_sql = spark.sql("SELECT count(*) AS n FROM events").first().n
    assert n_sql == load_table(spark, SF0001, "events").count()
    top = spark.sql(
        "SELECT event_type, count(*) AS n FROM events GROUP BY event_type ORDER BY n DESC LIMIT 1"
    ).first()
    assert top.n > 0
    # the derived partsupp rides along (r12): 4 suppliers per part, TPC-H
    # queries over ps_* columns run through the SQL door with no fixture
    ps = spark.sql(
        "SELECT count(*) AS n, count(DISTINCT ps_partkey) AS parts FROM partsupp"
    ).first()
    assert ps.n == 4 * load_table(spark, SF0001, "part").count()
    assert ps.parts == load_table(spark, SF0001, "part").count()
