"""Streaming CDC apply: maintain a keyed parquet snapshot from a stream of
change events — the streaming face of ``operators.merge`` (the reference
engine has no mutation surface; north-star §2.7 warehouse pattern).

Change rows are ``(key..., value..., op, ts)`` with ``op`` in
{'upsert', 'delete'}. Each micro-batch is collapsed to LAST-WRITER-WINS per
key (max ts; deterministic tie-break on op so replays converge) and merged
into the snapshot with the same single full-outer equi-join
``merge_upsert`` uses: matched+upsert -> replace values, matched+delete ->
drop, unmatched+upsert -> insert.

Scale posture: the per-batch merge is ONE shuffle (both sides hash on the
key; at scale the collapsed batch is small -> AQE broadcasts it); the
snapshot rewrite is the classic copy-on-write table pattern — at 100 TB
the snapshot would be a Delta/Iceberg table so only matched files rewrite,
here it is plain parquet written to a fresh generation directory and
atomically swapped (write-audit-publish), never overwritten in place (a
failed job mid-overwrite must not destroy the current snapshot; and Spark
cannot overwrite a path it is reading in the same job).

foreachBatch is exactly-once per epoch under checkpointing: replayed
batches re-merge idempotently because last-writer-wins collapse plus
key-join are deterministic functions of (snapshot, batch).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_GEN = "_generation"


def _snapshot_path(snapshot_dir: str) -> str | None:
    """Current generation's data path, or None before the first publish."""
    marker = os.path.join(snapshot_dir, _GEN)
    if not os.path.exists(marker):
        return None
    with open(marker) as f:
        gen = f.read().strip()
    return os.path.join(snapshot_dir, f"gen-{gen}")


def read_snapshot(spark: SparkSession, snapshot_dir: str) -> DataFrame | None:
    path = _snapshot_path(snapshot_dir)
    return None if path is None else spark.read.parquet(path)


def _publish(df: DataFrame, snapshot_dir: str) -> None:
    """Write-audit-publish: materialize the new state into the NEXT
    generation directory, then flip the pointer file. Readers following the
    pointer never see a partial write; the previous generation stays on
    disk until the next publish removes it."""
    marker = os.path.join(snapshot_dir, _GEN)
    cur = 0
    if os.path.exists(marker):
        with open(marker) as f:
            cur = int(f.read().strip())
    nxt = cur + 1
    out = os.path.join(snapshot_dir, f"gen-{nxt}")
    df.write.mode("overwrite").parquet(out)
    os.makedirs(snapshot_dir, exist_ok=True)
    with open(marker + ".tmp", "w") as f:
        f.write(str(nxt))
    os.replace(marker + ".tmp", marker)  # atomic pointer flip
    old = os.path.join(snapshot_dir, f"gen-{cur}")
    if cur and os.path.isdir(old):
        shutil.rmtree(old, ignore_errors=True)


def collapse_batch(batch: DataFrame, key: str, ts_col: str = "ts") -> DataFrame:
    """Last-writer-wins per key: keep the row with max ts (ties: 'delete'
    beats 'upsert', then op name desc — any deterministic total order keeps
    replays convergent)."""
    w = Window.partitionBy(key).orderBy(F.desc(ts_col), F.desc("op"))
    return (
        batch.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def merge_batch(
    spark: SparkSession,
    batch: DataFrame,
    snapshot_dir: str,
    key: str,
    value_cols: list[str],
    ts_col: str = "ts",
) -> None:
    """Apply one collapsed micro-batch to the snapshot (see module doc)."""
    delta = collapse_batch(batch, key, ts_col).select(
        F.col(key), F.col("op"), *[F.col(c).alias(f"_d_{c}") for c in value_cols]
    )
    base = read_snapshot(spark, snapshot_dir)
    if base is None:
        merged = delta.filter(F.col("op") == "upsert").select(
            key, *[F.col(f"_d_{c}").alias(c) for c in value_cols]
        )
    else:
        j = base.join(delta, key, "full_outer")
        merged = (
            j.filter((F.col("op").isNull()) | (F.col("op") == "upsert"))
            .select(
                key,
                *[
                    F.when(F.col("op") == "upsert", F.col(f"_d_{c}"))
                    .otherwise(F.col(c))
                    .alias(c)
                    for c in value_cols
                ],
            )
        )
    _publish(merged, snapshot_dir)


def apply_cdc_stream(
    updates: DataFrame,
    snapshot_dir: str,
    key: str,
    value_cols: list[str],
    ts_col: str = "ts",
    checkpoint: str | None = None,
):
    """Start the maintenance query: every micro-batch merges into the
    snapshot via :func:`merge_batch`. Returns the StreamingQuery; callers
    drive it with ``trigger(availableNow=True)`` semantics by awaiting
    termination (the writeStream below already sets availableNow so a
    bounded source runs to completion, the repo's streaming-test idiom)."""
    spark = updates.sparkSession

    def apply(batch: DataFrame, _epoch: int) -> None:
        merge_batch(spark, batch, snapshot_dir, key, value_cols, ts_col)

    writer = updates.writeStream.foreachBatch(apply).trigger(availableNow=True)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()
