"""Streaming heavy-hitters: windowed Count-Min sketch over an event stream —
the fixed-memory "what's trending per hour" operator. Streaming face of
:mod:`..operators.sketches`.

State shape is the whole point: a naive per-(window, key) count keeps one
state row per DISTINCT key per window (unbounded for high-cardinality keys
like URLs or user agents); the CMS keeps at most DEPTH x WIDTH rows per
window — a config constant. Counts are mergeable sums, so map-side partial
aggregation and late-data merging work unchanged, and the streaming sketch
equals the batch sketch on the same data exactly (order-insensitive).

Estimation against the materialized sketch reuses ``sketches.cms_estimate``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from baum_welch_spark.operators.sketches import CMS_DEPTH, _probe_cols


def windowed_cms(
    events: DataFrame,
    key: str = "event_type",
    window: str = "1 hour",
    watermark: str = "1 hour",
) -> DataFrame:
    """Per-window CMS build over ``key``: output
    (w_start, row, bucket, cnt) — at most DEPTH x WIDTH state rows per
    window, evicted once the watermark passes the window."""
    probes = events.withWatermark("ts", watermark).select("ts", *_probe_cols(key))
    per_row = [
        probes.select("ts", F.lit(i).alias("row"), F.col(f"b{i}").alias("bucket"))
        for i in range(CMS_DEPTH)
    ]
    exploded = per_row[0]
    for p in per_row[1:]:
        exploded = exploded.unionByName(p)
    return (
        exploded.groupBy(F.window("ts", window).alias("w"), "row", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("w.start").alias("w_start"), "row", "bucket", "cnt")
    )


def streaming_hll_registers(events: DataFrame, key: str = "user_id") -> DataFrame:
    """Streaming HLL register table per event type: one stateful
    ``groupBy(event_type, bucket).max(rho)`` — the streaming-distinct
    design. State is at most HLL_M rows per group FOREVER (vs exact
    distinct whose state grows with key cardinality), max is mergeable so
    late/out-of-order data folds in unchanged, and the streaming registers
    equal the batch registers on the same data exactly (max is
    order-insensitive) — which is what lets the face below share the batch
    face's DuckDB oracle verbatim."""
    from baum_welch_spark.functions.columns import portable_hash60
    from baum_welch_spark.operators.sketches import HLL_M, _hll_rho

    h = portable_hash60(key)
    return (
        events.select(
            "event_type",
            (h % HLL_M).alias("bucket"),
            _hll_rho(F.shiftright(h, 6)).alias("rho"),
        )
        .groupBy("event_type", "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def streaming_hll_distinct(spark, sf_dir: str) -> DataFrame:
    """Driver-contract face: portable-HLL distinct users per event type
    with the REGISTERS built through the real Structured Streaming path
    (file-source micro-batches, complete mode over the finite source),
    then estimated with the same bit-reproducible arithmetic as the batch
    face — hash-exact on the SAME oracle SQL as ``hll_distinct_users``
    (registers are order-insensitive maxes, so streaming == batch == SQL).
    """
    from baum_welch_spark.operators.sketches import hll_estimate
    from baum_welch_spark.streaming.sessionize import run_to_memory, stream_events

    ev = stream_events(spark, sf_dir)
    run_to_memory(streaming_hll_registers(ev), "hll_registers_stream")
    reg = spark.table("hll_registers_stream")
    exact = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n_exact"))
    )
    return (
        hll_estimate(reg, ["event_type"])
        .join(exact, "event_type")
        .select("event_type", "n_exact", "hll_est")
        .orderBy("event_type")
    )
