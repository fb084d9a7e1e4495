"""Composite (multi-column) keys for the bucketed CDC snapshot (r9):
merge/read/time-travel/diff/agg_delta keyed on a column TUPLE, with the
manifest recording the composite and guarding later calls, and the
single-key manifest encoding unchanged (a bare string, byte-compatible
with every pre-composite snapshot)."""

import json
import os

import pytest
from pyspark.sql import functions as F

from baum_welch_spark.streaming.upsert import (
    agg_delta,
    collapse_delta,
    compact_snapshot,
    merge_batch,
    read_snapshot,
    read_snapshot_at,
    snapshot_diff,
)

KEY = ["store_id", "sku"]
SCHEMA = "store_id bigint, sku string, qty double, op string, ts long"


def _batch(spark, rows):
    return spark.createDataFrame(rows, schema=SCHEMA)


def _state(spark, snap):
    df = read_snapshot(spark, snap)
    return {} if df is None else {(r.store_id, r.sku): r.qty for r in df.collect()}


def _apply_ref(ref, rows):
    # reference last-writer-wins fold (max ts wins; upsert beats delete on
    # ties via descending op name — mirrors collapse_batch's ordering)
    best = {}
    for store, sku, qty, op, ts in rows:
        k = (store, sku)
        if k not in best or (ts, op) > (best[k][0], best[k][1]):
            best[k] = (ts, op, qty)
    for k, (_, op, qty) in best.items():
        if op == "delete":
            ref.pop(k, None)
        else:
            ref[k] = qty
    return ref


def test_composite_key_lifecycle_matches_reference(spark, tmp_path):
    snap = str(tmp_path / "snap")
    b1 = [(s, f"sku-{i}", float(10 * s + i), "upsert", 1) for s in range(3) for i in range(4)]
    # same sku under DIFFERENT stores must stay independent rows — the
    # property a single-column key cannot express
    b2 = [(0, "sku-1", 99.0, "upsert", 2), (1, "sku-1", 77.0, "delete", 2)]
    b3 = [(2, "sku-0", 55.0, "upsert", 3), (2, "sku-9", 5.0, "upsert", 3)]
    ref = {}
    for rows in (b1, b2, b3):
        merge_batch(spark, _batch(spark, rows), snap, KEY, ["qty"], n_buckets=4)
        ref = _apply_ref(ref, rows)
        assert _state(spark, snap) == ref
    # manifest records the composite as a list, single-key stays a string
    with open(os.path.join(snap, "_manifest.json")) as f:
        assert json.load(f)["key"] == KEY


def test_composite_key_guards_and_bucket_pruning(spark, tmp_path):
    snap = str(tmp_path / "snap")
    rows = [(s, f"sku-{i}", 1.0, "upsert", 1) for s in range(4) for i in range(8)]
    merge_batch(spark, _batch(spark, rows), snap, KEY, ["qty"], n_buckets=8)
    # a different key tuple (or a prefix of the composite) fails fast
    with pytest.raises(ValueError, match="keyed on"):
        merge_batch(spark, _batch(spark, rows), snap, ["store_id"], ["qty"])
    with pytest.raises(ValueError, match="keyed on"):
        merge_batch(spark, _batch(spark, rows), snap, ["sku", "store_id"], ["qty"])
    # a one-tuple touch merges without rewriting untouched buckets: the
    # touched set is derived from the composite hash
    gen_before = json.load(open(os.path.join(snap, "_manifest.json")))["buckets"]
    merge_batch(spark, _batch(spark, [(0, "sku-0", 42.0, "upsert", 2)]), snap, KEY, ["qty"])
    gen_after = json.load(open(os.path.join(snap, "_manifest.json")))["buckets"]
    moved = [b for b in gen_after if gen_before.get(b) != gen_after[b]]
    assert len(moved) == 1  # exactly the one bucket holding (0, sku-0)
    assert _state(spark, snap)[(0, "sku-0")] == 42.0


def test_composite_key_time_travel_and_diff(spark, tmp_path):
    snap = str(tmp_path / "snap")
    b1 = [(s, f"sku-{i}", float(i), "upsert", 1) for s in range(2) for i in range(3)]
    b2 = [(0, "sku-0", 9.0, "upsert", 2), (1, "sku-2", 0.0, "delete", 2),
          (5, "sku-new", 7.0, "upsert", 2)]
    merge_batch(spark, _batch(spark, b1), snap, KEY, ["qty"], n_buckets=4, retain=3)
    merge_batch(spark, _batch(spark, b2), snap, KEY, ["qty"], retain=3)
    v1 = {(r.store_id, r.sku): r.qty for r in read_snapshot_at(spark, snap, 1).collect()}
    assert v1 == _apply_ref({}, b1)
    d = snapshot_diff(spark, snap, 1, 2, KEY, ["qty"])
    got = {(r.store_id, r.sku): (r.op, r.old_qty, r.new_qty) for r in d.collect()}
    assert got == {
        (0, "sku-0"): ("update", 0.0, 9.0),
        (1, "sku-2"): ("delete", 2.0, None),
        (5, "sku-new"): ("insert", None, 7.0),
    }


def test_composite_key_agg_delta_and_compact(spark, tmp_path):
    snap = str(tmp_path / "snap")
    b1 = [(0, "a", 10.0, "upsert", 1), (0, "b", 20.0, "upsert", 1), (1, "a", 5.0, "upsert", 1)]
    merge_batch(spark, _batch(spark, b1), snap, KEY, ["qty"], n_buckets=4)
    b2 = [(0, "a", 13.0, "upsert", 2), (1, "a", 0.0, "delete", 2), (2, "c", 4.0, "upsert", 2)]
    d = collapse_delta(_batch(spark, b2), KEY, ["qty"], snapshot_dir=snap)
    got = {(r.store_id, r.sku): (r.d_value, r.d_count) for r in
           agg_delta(spark, d, snap, KEY, "qty").collect()}
    assert got == {(0, "a"): (3.0, 0), (1, "a"): (-5.0, -1), (2, "c"): (4.0, 1)}
    merge_batch(spark, _batch(spark, b2), snap, KEY, ["qty"])
    before = _state(spark, snap)
    # compaction re-buckets under the composite hash and preserves state
    compact_snapshot(spark, snap, KEY, n_buckets=2)
    assert _state(spark, snap) == before
    m = json.load(open(os.path.join(snap, "_manifest.json")))
    assert m["n_buckets"] == 2 and m["key"] == KEY
    with pytest.raises(ValueError, match="n_buckets"):
        merge_batch(spark, _batch(spark, b1), snap, KEY, ["qty"], n_buckets=4)


def test_composite_key_streaming_apply(spark, tmp_path):
    """apply_cdc_stream with a composite key: the foreachBatch merge path
    threads the tuple through collapse/bucket/join exactly like the batch
    entry point (micro-batched by maxFilesPerTrigger to force >1 epoch)."""
    from baum_welch_spark.streaming.upsert import apply_cdc_stream, read_snapshot

    upd = str(tmp_path / "upd")
    snap = str(tmp_path / "snap")
    ckpt = str(tmp_path / "ckpt")
    b1 = [(0, "x", 1.0, "upsert", 1), (1, "x", 2.0, "upsert", 1), (0, "y", 3.0, "upsert", 1)]
    b2 = [(0, "x", 9.0, "upsert", 2), (1, "x", 0.0, "delete", 2)]
    for rows in (b1, b2):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(upd)
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(upd)
    )
    q = apply_cdc_stream(stream, snap, KEY, ["qty"], checkpoint=ckpt, n_buckets=4)
    q.awaitTermination(300)
    got = {(r.store_id, r.sku): r.qty for r in read_snapshot(spark, snap).collect()}
    assert got == {(0, "x"): 9.0, (0, "y"): 3.0}


def test_crashed_merge_leaves_readers_on_old_version_and_replay_converges(spark, tmp_path):
    """The write-audit-publish crash window for the MERGE itself: a
    generation directory fully written but the manifest never flipped
    (crash between the parquet write and _write_manifest) must be
    invisible to every reader — read_snapshot, time travel, diff — and a
    replay of the same batch (the foreachBatch redelivery contract) must
    converge to the state one clean merge produces, orphan dir and all."""
    import os
    import shutil

    from baum_welch_spark.streaming.upsert import (
        merge_batch,
        read_snapshot,
        read_snapshot_at,
    )

    snap = str(tmp_path / "snap")
    b1 = [(s, f"sku-{i}", float(i), "upsert", 1) for s in range(2) for i in range(3)]
    merge_batch(spark, _batch(spark, b1), snap, KEY, ["qty"], n_buckets=4, retain=3)
    before_manifest = open(os.path.join(snap, "_manifest.json")).read()
    before_state = _state(spark, snap)

    # simulate the crash: run the merge against a SCRATCH COPY to obtain a
    # real gen-2 directory, transplant it into the live snapshot, and do
    # NOT flip the manifest
    scratch = str(tmp_path / "scratch")
    shutil.copytree(snap, scratch)
    b2 = [(0, "sku-0", 99.0, "upsert", 2), (1, "sku-1", 0.0, "delete", 2)]
    merge_batch(spark, _batch(spark, b2), scratch, KEY, ["qty"])
    shutil.copytree(
        os.path.join(scratch, "gen-2"), os.path.join(snap, "gen-2")
    )

    # readers never see the orphan generation
    assert open(os.path.join(snap, "_manifest.json")).read() == before_manifest
    assert _state(spark, snap) == before_state
    assert {
        (r.store_id, r.sku): r.qty for r in read_snapshot_at(spark, snap, 1).collect()
    } == before_state

    # redelivery: the same batch merges over the orphan and converges to
    # the clean-merge state (gen numbering continues from the MANIFEST,
    # so the replay overwrites the orphan dir rather than skipping a gen)
    merge_batch(spark, _batch(spark, b2), snap, KEY, ["qty"])
    assert _state(spark, snap) == _state(spark, scratch)
    assert read_snapshot(spark, snap).count() == 5  # 6 rows - 1 delete


def test_composite_key_ivm_fold(spark, tmp_path):
    """ivm_apply_batch under a composite key: the delta fingerprint, the
    group-map join, and the fold all operate on the tuple. Two batches
    fold into per-group (sum, count) equal to a full recompute."""
    from baum_welch_spark.streaming.upsert import ivm_apply_batch, read_ivm_state

    snap = str(tmp_path / "snap")
    gm = spark.createDataFrame(
        [(s, f"sku-{i}", "hot" if i == 0 else "cold") for s in range(2) for i in range(3)],
        "store_id bigint, sku string, seg string",
    )
    b1 = [(s, f"sku-{i}", float(10 * s + i), "upsert", 1) for s in range(2) for i in range(3)]
    b2 = [(0, "sku-0", 50.0, "upsert", 2), (1, "sku-2", 0.0, "delete", 2)]
    ref = {}
    for rows in (b1, b2):
        ivm_apply_batch(
            spark, _batch(spark, rows), snap, KEY, "qty", gm,
            group_col="seg", n_buckets=4,
        )
        ref = _apply_ref(ref, rows)
    seg_of = {(r.store_id, r.sku): r.seg for r in gm.collect()}
    expect = {}
    for kk, qty in ref.items():
        g = expect.setdefault(seg_of[kk], [0.0, 0])
        g[0] += qty
        g[1] += 1
    got = {g: (v[0], v[1]) for g, v in read_ivm_state(snap)["groups"].items()}
    assert got == {g: (v[0], v[1]) for g, v in expect.items()}
