"""Streaming CDC apply (streaming/upsert.py): drive a bounded file stream
of change events to completion and compare the maintained snapshot with a
batch-computed expected state."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from baum_welch_spark.sources.io import load_table
from baum_welch_spark.streaming.upsert import apply_cdc_stream, read_snapshot

from conftest import SF0001


def _make_updates(spark, out_dir):
    orders = load_table(spark, SF0001, "orders").select("o_orderkey", "o_totalprice")
    base = orders.select(
        "o_orderkey",
        F.col("o_totalprice").alias("price"),
        F.lit("upsert").alias("op"),
        F.lit(1).cast("long").alias("ts"),
    )
    bump = orders.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey",
        (F.col("o_totalprice") + 1.0).alias("price"),
        F.lit("upsert").alias("op"),
        F.lit(2).cast("long").alias("ts"),
    )
    dele = orders.filter(F.col("o_orderkey") % 97 == 0).select(
        "o_orderkey",
        F.lit(0.0).alias("price"),
        F.lit("delete").alias("op"),
        F.lit(3).cast("long").alias("ts"),
    )
    for i, df in enumerate([base, bump, dele]):
        df.coalesce(1).write.mode("append").parquet(out_dir)
    return base.unionByName(bump).unionByName(dele)


def test_cdc_stream_snapshot_matches_batch_lww(spark, tmp_path):
    upd_dir = str(tmp_path / "updates")
    snap_dir = str(tmp_path / "snapshot")
    ckpt = str(tmp_path / "ckpt")
    all_updates = _make_updates(spark, upd_dir)

    stream = (
        spark.readStream.schema("o_orderkey bigint, price double, op string, ts long")
        .option("maxFilesPerTrigger", 1)  # force multiple micro-batches
        .parquet(upd_dir)
    )
    q = apply_cdc_stream(stream, snap_dir, key="o_orderkey", value_cols=["price"], checkpoint=ckpt)
    q.awaitTermination(300)

    got = {r.o_orderkey: r.price for r in read_snapshot(spark, snap_dir).collect()}

    # expected: global last-writer-wins over all updates
    w = Window.partitionBy("o_orderkey").orderBy(F.desc("ts"), F.desc("op"))
    latest = (
        all_updates.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    )
    expect = {
        r.o_orderkey: r.price
        for r in latest.filter(F.col("op") == "upsert").collect()
    }
    assert got == expect
    assert len(got) > 0
    # deleted keys are gone, bumped keys carry the bump
    deleted = {r.o_orderkey for r in latest.filter(F.col("op") == "delete").collect()}
    assert deleted and not (deleted & set(got))
    bumped = [k for k in got if k % 7 == 0 and k % 97 != 0]
    orders = {
        r.o_orderkey: r.o_totalprice
        for r in load_table(spark, SF0001, "orders").collect()
    }
    assert bumped and all(abs(got[k] - (orders[k] + 1.0)) < 1e-9 for k in bumped)


def test_cdc_stream_checkpoint_restart_no_double_apply(spark, tmp_path):
    # run to completion, then drop MORE change files and restart with the
    # SAME checkpoint: only the new files may be processed (no re-apply of
    # old batches), and the final snapshot reflects both generations.
    upd_dir = str(tmp_path / "updates")
    snap_dir = str(tmp_path / "snapshot")
    ckpt = str(tmp_path / "ckpt")

    spark.createDataFrame(
        [(1, 10.0, "upsert", 1), (2, 20.0, "upsert", 1)],
        schema="o_orderkey bigint, price double, op string, ts long",
    ).coalesce(1).write.mode("append").parquet(upd_dir)

    def start():
        stream = (
            spark.readStream.schema("o_orderkey bigint, price double, op string, ts long")
            .option("maxFilesPerTrigger", 1)
            .parquet(upd_dir)
        )
        return apply_cdc_stream(
            stream, snap_dir, key="o_orderkey", value_cols=["price"], checkpoint=ckpt
        )

    q = start()
    q.awaitTermination(300)
    got1 = {r.o_orderkey: r.price for r in read_snapshot(spark, snap_dir).collect()}
    assert got1 == {1: 10.0, 2: 20.0}

    # second generation: bump key 1, delete key 2, insert key 3. If the
    # restart re-applied the first file, key 2 would come back.
    spark.createDataFrame(
        [(1, 11.0, "upsert", 2), (2, 0.0, "delete", 2), (3, 30.0, "upsert", 2)],
        schema="o_orderkey bigint, price double, op string, ts long",
    ).coalesce(1).write.mode("append").parquet(upd_dir)

    q = start()
    q.awaitTermination(300)
    got2 = {r.o_orderkey: r.price for r in read_snapshot(spark, snap_dir).collect()}
    assert got2 == {1: 11.0, 3: 30.0}
