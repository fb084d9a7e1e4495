"""merge_upsert / scd2_history semantics (operators/merge.py)."""

import os

from pyspark.sql import functions as F

from tests.conftest import SF0001


def _orders(spark):
    return spark.read.parquet(os.path.join(SF0001, "orders.parquet"))


def _events(spark):
    return spark.read.parquet(os.path.join(SF0001, "events.parquet"))


def test_merge_upsert_partitions_actions(spark):
    from baum_welch_spark.operators.merge import merge_upsert

    orders = _orders(spark)
    n_base = orders.count()
    out = merge_upsert(orders).persist()
    by_action = {r["action"]: r["n"] for r in out.groupBy("action").agg(F.count("*").alias("n")).collect()}
    n_upd = orders.where(F.col("o_orderkey") % 7 == 0).count()
    n_ins = orders.where(F.col("o_orderkey") % 97 == 0).count()
    assert by_action.get("update", 0) == n_upd
    assert by_action.get("insert", 0) == n_ins
    assert by_action.get("keep", 0) == n_base - n_upd
    # merge keys stay unique post-merge
    assert out.count() == out.select("o_orderkey").distinct().count() == n_base + n_ins
    # an updated row carries the bumped price (floor(cents*21/20)/100)
    sample = (
        out.where(F.col("action") == "update")
        .select("o_orderkey", F.col("o_totalprice").alias("new"))
        .join(orders.select("o_orderkey", F.col("o_totalprice").alias("old")), "o_orderkey")
        .limit(5)
        .collect()
    )
    for r in sample:
        cents = round(r["old"] * 100)
        assert abs(r["new"] - (cents * 21 // 20) / 100.0) < 1e-9
    out.unpersist()


def test_scd2_history_intervals(spark):
    from baum_welch_spark.operators.merge import scd2_history

    events = _events(spark)
    hist = scd2_history(events).persist()
    # exactly one open (valid_to IS NULL) interval per user
    open_per_user = (
        hist.where(F.col("valid_to").isNull()).groupBy("user_id").count()
    )
    assert open_per_user.where(F.col("count") != 1).count() == 0
    assert hist.select("user_id").distinct().count() == events.select("user_id").distinct().count()
    # intervals per user are contiguous: next valid_from == this valid_to,
    # versions dense from 1
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("version")
    chk = hist.select(
        "user_id",
        "version",
        "valid_from",
        "valid_to",
        F.lead("valid_from").over(w).alias("next_from"),
        F.row_number().over(w).alias("rn"),
    )
    assert chk.where(F.col("version") != F.col("rn")).count() == 0
    assert chk.where(
        F.col("next_from").isNotNull() & (F.col("next_from") != F.col("valid_to"))
    ).count() == 0
    # no zero-length or inverted interval
    assert hist.where(
        F.col("valid_to").isNotNull() & (F.col("valid_to") <= F.col("valid_from"))
    ).count() == 0
    # consecutive intervals always change type
    chk2 = hist.select("user_id", "version", "event_type",
                       F.lead("event_type").over(w).alias("next_type"))
    assert chk2.where(
        F.col("next_type").isNotNull() & (F.col("next_type") == F.col("event_type"))
    ).count() == 0
    hist.unpersist()
