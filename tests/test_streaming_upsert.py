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


def test_cdc_bucketed_rewrite_touches_only_batch_buckets(spark, tmp_path):
    """The 100 TB posture claim made mechanical: a micro-batch must rewrite
    ONLY the buckets containing its keys; every untouched bucket's files
    stay byte-identical (same paths, same bytes) across the generation flip."""
    import json
    import os

    from baum_welch_spark.streaming.upsert import merge_batch

    snap_dir = str(tmp_path / "snapshot")
    n_buckets = 8
    base = spark.createDataFrame(
        [(k, float(k) * 10.0, "upsert", 1) for k in range(1, 201)],
        schema="o_orderkey bigint, price double, op string, ts long",
    )
    merge_batch(spark, base, snap_dir, "o_orderkey", ["price"], n_buckets=n_buckets)
    with open(os.path.join(snap_dir, "_manifest.json")) as f:
        m1 = json.load(f)
    assert m1["gen"] == 1 and len(m1["buckets"]) == n_buckets

    def bucket_bytes(manifest):
        out = {}
        for b, g in manifest["buckets"].items():
            d = os.path.join(snap_dir, f"gen-{g}", f"bucket={b}")
            out[b] = {
                fn: open(os.path.join(d, fn), "rb").read()
                for fn in sorted(os.listdir(d))
                if fn.endswith(".parquet")
            }
        return out

    files1 = bucket_bytes(m1)

    # batch 2: touch exactly two keys (bump one, delete one)
    batch2 = spark.createDataFrame(
        [(7, 999.0, "upsert", 2), (13, 0.0, "delete", 2)],
        schema="o_orderkey bigint, price double, op string, ts long",
    )
    from baum_welch_spark.functions.columns import portable_hash60
    from pyspark.sql import functions as F

    touched = {
        str(r.b)
        for r in batch2.select(
            (portable_hash60(F.col("o_orderkey")) % n_buckets).cast("int").alias("b")
        ).distinct().collect()
    }
    merge_batch(spark, batch2, snap_dir, "o_orderkey", ["price"], n_buckets=n_buckets)
    with open(os.path.join(snap_dir, "_manifest.json")) as f:
        m2 = json.load(f)
    assert m2["gen"] == 2
    # gen-2 holds only the touched buckets
    written = {d.split("=")[1] for d in os.listdir(os.path.join(snap_dir, "gen-2")) if d.startswith("bucket=")}
    assert written == touched
    # untouched buckets: same generation pointer AND byte-identical files
    files2 = bucket_bytes(m2)
    for b in m2["buckets"]:
        if b in touched:
            assert m2["buckets"][b] == 2
        else:
            assert m2["buckets"][b] == m1["buckets"][b]
            assert files2[b] == files1[b]
    # final state is still the batch LWW expectation
    got = {r.o_orderkey: r.price for r in read_snapshot(spark, snap_dir).collect()}
    expect = {k: float(k) * 10.0 for k in range(1, 201) if k != 13}
    expect[7] = 999.0
    assert got == expect


def test_cdc_apply_batch_face_equals_global_lww(spark):
    """The face's sequential per-year apply must equal one global
    last-writer-wins merge computed directly (the DuckDB oracle's shape)."""
    from baum_welch_spark.streaming.upsert import cdc_apply_batch_face

    customer = load_table(spark, SF0001, "customer")
    orders = load_table(spark, SF0001, "orders")
    got = {r.cust_id: r.bal for r in cdc_apply_batch_face(spark, customer, orders).collect()}

    log = orders.select(
        F.col("o_custkey").alias("cust_id"),
        F.col("o_totalprice").alias("bal"),
        F.when(F.col("o_orderkey") % 37 == 0, F.lit("delete"))
        .otherwise(F.lit("upsert"))
        .alias("op"),
        (F.year("o_orderdate").cast("long") * F.lit(1000000000) + F.col("o_orderkey")).alias("ts"),
    )
    w = Window.partitionBy("cust_id").orderBy(F.desc("ts"))
    lww = log.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    j = customer.join(lww, customer.c_custkey == lww.cust_id, "full_outer")
    expect = {
        r.k: round(r.v, 2)
        for r in j.filter(F.col("op").isNull() | (F.col("op") == "upsert"))
        .select(
            F.coalesce("c_custkey", "cust_id").alias("k"),
            F.when(F.col("op") == "upsert", F.col("bal")).otherwise(F.col("c_acctbal")).alias("v"),
        )
        .collect()
    }
    assert len(got) > 0 and got == expect


def test_time_travel_reads_each_version_exactly(spark, tmp_path):
    """With retain covering all versions, read_snapshot_at(v) returns the
    state exactly as of the v-th committed merge; versions structurally
    share untouched generation dirs (no k-full-copies)."""
    import os

    from baum_welch_spark.streaming.upsert import (
        list_versions,
        merge_batch,
        read_snapshot_at,
    )

    snap = str(tmp_path / "snap")
    batches = [
        [(1, 10.0, "upsert", 1), (2, 20.0, "upsert", 1), (3, 30.0, "upsert", 1)],
        [(2, 21.0, "upsert", 2)],
        [(3, 0.0, "delete", 3), (4, 40.0, "upsert", 3)],
    ]
    for b in batches:
        df = spark.createDataFrame(b, "k long, v double, op string, ts long")
        merge_batch(spark, df, snap, "k", ["v"], n_buckets=4, retain=3)
    assert list_versions(snap) == [1, 2, 3]
    expect = {
        1: {1: 10.0, 2: 20.0, 3: 30.0},
        2: {1: 10.0, 2: 21.0, 3: 30.0},
        3: {1: 10.0, 2: 21.0, 4: 40.0},
    }
    for v, want in expect.items():
        got = {r.k: r.v for r in read_snapshot_at(spark, snap, v).collect()}
        assert got == want, f"version {v}"
    # structural sharing: gen-1 must still exist (versions 2 and 3 point
    # untouched buckets at it) and there are exactly 3 generation dirs —
    # retaining 3 versions did NOT triple the data
    gens = sorted(d for d in os.listdir(snap) if d.startswith("gen-"))
    assert gens == ["gen-1", "gen-2", "gen-3"]
    # unknown / never-committed version -> KeyError
    with pytest.raises(KeyError):
        read_snapshot_at(spark, snap, 99)


def test_retention_gc_drops_old_versions_and_their_generations(spark, tmp_path):
    """retain=1 keeps only the current version: older version files are
    GC'd, read_snapshot_at on them raises, and generation dirs referenced
    ONLY by dropped versions are deleted — while generations the current
    manifest still points at survive."""
    import json
    import os

    from baum_welch_spark.streaming.upsert import (
        list_versions,
        merge_batch,
        read_snapshot,
        read_snapshot_at,
    )

    snap = str(tmp_path / "snap")
    base = spark.createDataFrame(
        [(k, float(k), "upsert", 1) for k in range(1, 41)],
        "k long, v double, op string, ts long",
    )
    merge_batch(spark, base, snap, "k", ["v"], n_buckets=4, retain=1)
    # touch one key -> one bucket; gen-1 still holds the other buckets
    b2 = spark.createDataFrame([(1, 99.0, "upsert", 2)], "k long, v double, op string, ts long")
    merge_batch(spark, b2, snap, "k", ["v"], n_buckets=4, retain=1)
    assert list_versions(snap) == [2]
    with pytest.raises(KeyError):
        read_snapshot_at(spark, snap, 1)
    # gen-1 survives (current manifest points untouched buckets at it)
    with open(os.path.join(snap, "_manifest.json")) as f:
        m = json.load(f)
    assert sorted(set(m["buckets"].values())) == [1, 2]
    assert os.path.isdir(os.path.join(snap, "gen-1"))
    # a third merge touching the SAME bucket with retain=1 must GC gen-2
    # (nothing references it afterwards)
    b3 = spark.createDataFrame([(1, 100.0, "upsert", 3)], "k long, v double, op string, ts long")
    merge_batch(spark, b3, snap, "k", ["v"], n_buckets=4, retain=1)
    assert not os.path.isdir(os.path.join(snap, "gen-2"))
    got = {r.k: r.v for r in read_snapshot(spark, snap).collect()}
    assert got[1] == 100.0 and len(got) == 40


def test_time_travel_face_equals_year_capped_lww(spark):
    """The face's historical read must equal a year-capped global LWW
    computed directly — later years are in the change-log and the current
    snapshot but invisible to the versioned read (the oracle's shape)."""
    from baum_welch_spark.streaming.upsert import cdc_time_travel_face

    customer = load_table(spark, SF0001, "customer")
    orders = load_table(spark, SF0001, "orders")
    got = {r.cust_id: r.bal for r in cdc_time_travel_face(spark, customer, orders).collect()}

    log = orders.select(
        F.col("o_custkey").alias("cust_id"),
        F.col("o_totalprice").alias("bal"),
        F.when(F.col("o_orderkey") % 37 == 0, F.lit("delete"))
        .otherwise(F.lit("upsert"))
        .alias("op"),
        (F.year("o_orderdate").cast("long") * F.lit(1000000000) + F.col("o_orderkey")).alias("ts"),
    ).filter((F.col("ts") / 1000000000 >= 1998) & (F.col("ts") / 1000000000 < 2000))
    w = Window.partitionBy("cust_id").orderBy(F.desc("ts"))
    lww = log.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    j = customer.join(lww, customer.c_custkey == lww.cust_id, "full_outer")
    expect = {
        r.k: round(r.v, 2)
        for r in j.filter(F.col("op").isNull() | (F.col("op") == "upsert"))
        .select(
            F.coalesce("c_custkey", "cust_id").alias("k"),
            F.when(F.col("op") == "upsert", F.col("bal")).otherwise(F.col("c_acctbal")).alias("v"),
        )
        .collect()
    }
    assert len(got) > 0 and got == expect
    # the historical state differs from the final one (later years matter)
    from baum_welch_spark.streaming.upsert import cdc_apply_batch_face

    final = {r.cust_id: r.bal for r in cdc_apply_batch_face(spark, customer, orders).collect()}
    assert final != got


def test_snapshot_diff_matches_brute_force_and_prunes_buckets(spark, tmp_path):
    """snapshot_diff == brute-force diff of the two version reads, AND its
    scan touches only files in buckets whose generation pointer differs
    between the two version manifests."""
    import json
    import os

    from baum_welch_spark.streaming.upsert import merge_batch, snapshot_diff

    snap = str(tmp_path / "snap")
    base = spark.createDataFrame(
        [(k, float(k), "upsert", 1) for k in range(1, 101)],
        "k long, v double, op string, ts long",
    )
    merge_batch(spark, base, snap, "k", ["v"], n_buckets=8, retain=4)
    b2 = spark.createDataFrame(
        [(5, 55.0, "upsert", 2), (6, 0.0, "delete", 2), (1000, 1.0, "upsert", 2)],
        "k long, v double, op string, ts long",
    )
    merge_batch(spark, b2, snap, "k", ["v"], n_buckets=8, retain=4)
    b3 = spark.createDataFrame(
        [(5, 66.0, "upsert", 3)], "k long, v double, op string, ts long"
    )
    merge_batch(spark, b3, snap, "k", ["v"], n_buckets=8, retain=4)

    d = snapshot_diff(spark, snap, v_from=1, v_to=3, key="k", value_cols=["v"])
    got = {r.k: (r.op, r.old_v, r.new_v) for r in d.collect()}
    assert got == {
        5: ("update", 5.0, 66.0),
        6: ("delete", 6.0, None),
        1000: ("insert", None, 1.0),
    }
    # bucket pruning: every scanned file sits in a bucket whose pointer
    # differs between v-1 and v-3
    with open(os.path.join(snap, "_versions", "v-1.json")) as f:
        m1 = json.load(f)
    with open(os.path.join(snap, "_versions", "v-3.json")) as f:
        m3 = json.load(f)
    changed = {
        b for b in set(m1["buckets"]) | set(m3["buckets"])
        if m1["buckets"].get(b) != m3["buckets"].get(b)
    }
    assert changed and len(changed) < 8  # the pruning is non-trivial here
    for path in d.inputFiles():
        bucket = next(p.split("=")[1] for p in path.split("/") if p.startswith("bucket="))
        assert bucket in changed, path
    # identical versions diff to empty
    assert snapshot_diff(spark, snap, 3, 3, "k", ["v"]).count() == 0


def test_agg_delta_four_cases(spark, tmp_path):
    """agg_delta's per-row semantics: update (new-old, +0), insert (+new,
    +1), delete-existing (-old, -1), delete-missing (no row)."""
    from baum_welch_spark.streaming.upsert import (
        agg_delta,
        collapse_delta,
        merge_batch,
    )

    snap = str(tmp_path / "snap")
    base = spark.createDataFrame(
        [(1, 10.0, "upsert", 0), (2, 20.0, "upsert", 0)],
        "k long, v double, op string, ts long",
    )
    merge_batch(spark, base, snap, "k", ["v"])
    batch = spark.createDataFrame(
        [
            (1, 15.0, "upsert", 1),   # update: +5, 0
            (3, 7.0, "upsert", 1),    # insert: +7, +1
            (2, 0.0, "delete", 1),    # delete existing: -20, -1
            (9, 0.0, "delete", 1),    # delete missing: no row
        ],
        "k long, v double, op string, ts long",
    )
    d = collapse_delta(batch, "k", ["v"], snapshot_dir=snap)
    rows = {r.k: (r.d_value, r.d_count) for r in agg_delta(spark, d, snap, "k", "v").collect()}
    assert rows == {1: (5.0, 0), 3: (7.0, 1), 2: (-20.0, -1)}
    # fold == recompute after applying the batch
    merge_batch(spark, batch, snap, "k", ["v"])
    from baum_welch_spark.streaming.upsert import read_snapshot as rs

    final = rs(spark, snap).agg(F.sum("v"), F.count("*")).first()
    assert (30.0 + sum(v for v, _ in rows.values()),
            2 + sum(c for _, c in rows.values())) == (final[0], final[1])


def test_ivm_face_equals_snapshot_recompute(spark):
    """The incremental segment aggregate lands exactly on a recompute over
    the final snapshot (sf0.001)."""
    from baum_welch_spark.streaming.upsert import ivm_segment_stats_face

    customer = load_table(spark, SF0001, "customer")
    orders = load_table(spark, SF0001, "orders")
    inc = {
        r.segment: (r.sum_bal, r.n_customers)
        for r in ivm_segment_stats_face(spark, customer, orders).collect()
    }
    # recompute: global LWW in pure DataFrame ops
    log = orders.select(
        F.col("o_custkey").alias("cust_id"),
        F.col("o_totalprice").alias("bal"),
        F.when(F.col("o_orderkey") % 37 == 0, F.lit("delete")).otherwise(F.lit("upsert")).alias("op"),
        (F.year("o_orderdate").cast("long") * F.lit(1000000000) + F.col("o_orderkey")).alias("ts"),
    ).filter(F.year(F.to_timestamp(F.lit("1998-01-01"))) <= F.col("ts") / 1000000000)
    w = Window.partitionBy("cust_id").orderBy(F.desc("ts"))
    lww = log.withColumn("rn", F.row_number().over(w)).filter("rn = 1").drop("rn", "ts")
    fin = (
        customer.select(F.col("c_custkey").alias("cust_id"), F.col("c_acctbal").alias("bal0"),
                        F.col("c_mktsegment").alias("segment"))
        .join(lww, "cust_id", "full_outer")
        .filter((F.col("op").isNull()) | (F.col("op") == "upsert"))
        .select("segment",
                F.when(F.col("op") == "upsert", F.col("bal")).otherwise(F.col("bal0")).alias("v"))
    )
    ref = {
        r.segment: (float(r.s), r.n)
        for r in fin.groupBy("segment").agg(F.round(F.sum("v"), 2).alias("s"), F.count("*").alias("n")).collect()
    }
    assert set(inc) == set(ref)
    for seg in ref:
        assert inc[seg][1] == ref[seg][1], seg
        assert inc[seg][0] == pytest.approx(ref[seg][0], abs=0.02), seg


def test_n_buckets_manifest_contract(spark, tmp_path):
    """The bucket modulus is TABLE metadata: stored in the manifest at
    creation, honored when omitted, and a contradicting explicit value
    fails fast instead of silently scattering keys."""
    import json
    import os

    from baum_welch_spark.streaming.upsert import (
        merge_batch,
        read_snapshot,
        snapshot_n_buckets,
    )

    snap = str(tmp_path / "snap")
    base = spark.createDataFrame(
        [(k, float(k), "upsert", 1) for k in range(1, 41)],
        "k long, v double, op string, ts long",
    )
    merge_batch(spark, base, snap, "k", ["v"], n_buckets=4)
    with open(os.path.join(snap, "_manifest.json")) as f:
        assert json.load(f)["n_buckets"] == 4
    assert snapshot_n_buckets(snap) == 4

    # (a) explicit mismatching modulus -> fail fast, snapshot untouched
    b2 = spark.createDataFrame([(1, 99.0, "upsert", 2)], "k long, v double, op string, ts long")
    with pytest.raises(ValueError, match="n_buckets=4"):
        merge_batch(spark, b2, snap, "k", ["v"], n_buckets=16)
    assert {r.k: r.v for r in read_snapshot(spark, snap).collect()}[1] == 1.0

    # (b) omitted on an existing snapshot -> the STORED value wins (4, not
    # DEFAULT_BUCKETS=16): merge succeeds and the key lands in the bucket
    # hashed under modulus 4 (a wrong modulus would orphan it)
    merge_batch(spark, b2, snap, "k", ["v"])
    with open(os.path.join(snap, "_manifest.json")) as f:
        m = json.load(f)
    assert m["n_buckets"] == 4 and all(int(b) < 4 for b in m["buckets"])
    assert {r.k: r.v for r in read_snapshot(spark, snap).collect()}[1] == 99.0

    # (c) matching explicit value still accepted
    b3 = spark.createDataFrame([(2, 50.0, "upsert", 3)], "k long, v double, op string, ts long")
    merge_batch(spark, b3, snap, "k", ["v"], n_buckets=4)
    assert {r.k: r.v for r in read_snapshot(spark, snap).collect()}[2] == 50.0


def test_legacy_manifest_without_n_buckets_still_loads(spark, tmp_path):
    """Manifests written before the n_buckets key: reads work unchanged and
    a merge with an explicit (correct) modulus proceeds — the guard only
    fires on a CONTRADICTING stored value."""
    import json
    import os

    from baum_welch_spark.streaming.upsert import merge_batch, read_snapshot

    snap = str(tmp_path / "snap")
    base = spark.createDataFrame(
        [(k, float(k), "upsert", 1) for k in range(1, 21)],
        "k long, v double, op string, ts long",
    )
    merge_batch(spark, base, snap, "k", ["v"], n_buckets=4)
    # strip the key from the current manifest AND its version file,
    # simulating a pre-r9 table
    for path in [os.path.join(snap, "_manifest.json"),
                 os.path.join(snap, "_versions", "v-1.json")]:
        with open(path) as f:
            m = json.load(f)
        m.pop("n_buckets", None)
        with open(path, "w") as f:
            json.dump(m, f)
    assert read_snapshot(spark, snap).count() == 20
    b2 = spark.createDataFrame([(1, 99.0, "upsert", 2)], "k long, v double, op string, ts long")
    merge_batch(spark, b2, snap, "k", ["v"], n_buckets=4)  # no raise
    got = {r.k: r.v for r in read_snapshot(spark, snap).collect()}
    assert got[1] == 99.0 and len(got) == 20
    # and the upgrade is sticky: the new manifest records the modulus
    with open(os.path.join(snap, "_manifest.json")) as f:
        assert json.load(f)["n_buckets"] == 4


def test_compact_snapshot_rebuckets(spark, tmp_path):
    """compact_snapshot rewrites the table under a new modulus: same rows,
    new manifest records the new n_buckets, subsequent merges omit the
    argument and land on the new modulus; the old explicit value now
    fails fast."""
    import json
    import os

    from baum_welch_spark.streaming.upsert import (
        compact_snapshot,
        merge_batch,
        read_snapshot,
    )

    snap = str(tmp_path / "snap")
    base = spark.createDataFrame(
        [(k, float(k), "upsert", 1) for k in range(1, 101)],
        "k long, v double, op string, ts long",
    )
    merge_batch(spark, base, snap, "k", ["v"], n_buckets=4)
    before = {r.k: r.v for r in read_snapshot(spark, snap).collect()}
    compact_snapshot(spark, snap, "k", n_buckets=8)
    with open(os.path.join(snap, "_manifest.json")) as f:
        m = json.load(f)
    assert m["n_buckets"] == 8 and len(m["buckets"]) == 8
    assert {r.k: r.v for r in read_snapshot(spark, snap).collect()} == before
    # merges now run under the new modulus
    b2 = spark.createDataFrame([(1, 99.0, "upsert", 2)], "k long, v double, op string, ts long")
    with pytest.raises(ValueError, match="n_buckets=8"):
        merge_batch(spark, b2, snap, "k", ["v"], n_buckets=4)
    merge_batch(spark, b2, snap, "k", ["v"])
    got = {r.k: r.v for r in read_snapshot(spark, snap).collect()}
    assert got[1] == 99.0 and len(got) == 100
    with pytest.raises(ValueError, match="no snapshot"):
        compact_snapshot(spark, str(tmp_path / "missing"), "k", 8)


def test_snapshot_diff_rejects_inverted_range_and_handles_null_values(spark, tmp_path):
    """v_from > v_to raises; NULL value columns diff correctly (presence is
    a marker column, not value-null-ness)."""
    from baum_welch_spark.streaming.upsert import merge_batch, snapshot_diff

    snap = str(tmp_path / "snap")
    base = spark.createDataFrame(
        [(1, 10.0, "upsert", 1), (2, None, "upsert", 1)],
        "k long, v double, op string, ts long",
    )
    merge_batch(spark, base, snap, "k", ["v"], n_buckets=4, retain=4)
    b2 = spark.createDataFrame(
        [(1, None, "upsert", 2), (2, 20.0, "upsert", 2), (3, None, "upsert", 2)],
        "k long, v double, op string, ts long",
    )
    merge_batch(spark, b2, snap, "k", ["v"], n_buckets=4, retain=4)
    with pytest.raises(ValueError, match="v_from"):
        snapshot_diff(spark, snap, v_from=2, v_to=1, key="k", value_cols=["v"])
    d = snapshot_diff(spark, snap, v_from=1, v_to=2, key="k", value_cols=["v"])
    got = {r.k: (r.op, r.old_v, r.new_v) for r in d.collect()}
    # key 1: value went 10.0 -> NULL (update, not a phantom delete);
    # key 2: NULL -> 20.0 (update, not a phantom insert); key 3: genuine
    # insert with a NULL value
    assert got == {
        1: ("update", 10.0, None),
        2: ("update", None, 20.0),
        3: ("insert", None, None),
    }


def test_stream_ivm_matches_recompute_and_survives_restart(spark, tmp_path):
    """apply_cdc_stream_ivm: the incrementally maintained group aggregate
    equals a full recompute over the final snapshot, and a checkpointed
    RESTART with more change files neither double-counts folded batches
    nor misses new ones (epoch fencing around the non-idempotent fold)."""
    from baum_welch_spark.streaming.upsert import (
        apply_cdc_stream_ivm,
        read_ivm_state,
        read_snapshot,
    )

    upd_dir = str(tmp_path / "updates")
    snap = str(tmp_path / "snap")
    ckpt = str(tmp_path / "ckpt")
    group_map = spark.createDataFrame(
        [(k, "even" if k % 2 == 0 else "odd") for k in range(1, 1001)],
        "k long, grp string",
    )

    spark.createDataFrame(
        [(1, 10.0, "upsert", 1), (2, 20.0, "upsert", 1), (3, 30.0, "upsert", 1)],
        "k long, v double, op string, ts long",
    ).coalesce(1).write.mode("append").parquet(upd_dir)
    spark.createDataFrame(
        [(1, 11.0, "upsert", 2), (2, 0.0, "delete", 2), (4, 40.0, "upsert", 2)],
        "k long, v double, op string, ts long",
    ).coalesce(1).write.mode("append").parquet(upd_dir)

    def start():
        stream = (
            spark.readStream.schema("k long, v double, op string, ts long")
            .option("maxFilesPerTrigger", 1)  # one micro-batch per file
            .parquet(upd_dir)
        )
        return apply_cdc_stream_ivm(
            stream, snap, key="k", value_col="v", group_map=group_map,
            group_col="grp", checkpoint=ckpt, n_buckets=4,
        )

    start().awaitTermination(300)

    def recompute():
        rows = (
            read_snapshot(spark, snap)
            .join(group_map, "k")
            .groupBy("grp")
            .agg(F.sum("v").alias("s"), F.count("*").alias("n"))
            .collect()
        )
        return {r.grp: (float(r.s), r.n) for r in rows}

    st = read_ivm_state(snap)
    got = {g: (v[0], v[1]) for g, v in st["groups"].items() if v[1] != 0 or v[0] != 0}
    assert got == recompute() == {"odd": (41.0, 2), "even": (40.0, 1)}

    # restart with one more file: key 4 deleted, key 5 inserted. A replayed
    # fold of the first two batches would double every sum.
    spark.createDataFrame(
        [(4, 0.0, "delete", 3), (5, 50.0, "upsert", 3)],
        "k long, v double, op string, ts long",
    ).coalesce(1).write.mode("append").parquet(upd_dir)
    start().awaitTermination(300)
    st2 = read_ivm_state(snap)
    got2 = {g: (v[0], v[1]) for g, v in st2["groups"].items() if v[1] != 0 or v[0] != 0}
    # key 4 deleted -> the 'even' group folds back to (0.0, 0) and drops
    # from both sides
    assert got2 == recompute() == {"odd": (91.0, 3)}


def test_stream_ivm_fence_crash_windows(spark, tmp_path):
    """The three replay windows of the gen-fenced IVM protocol, driven
    through the REAL per-batch function (ivm_apply_batch):
      (a) full double-apply (crash after merge, before epoch commit):
          the re-fold computes agg_delta against the already-merged
          snapshot where every delta row is a no-op — self-healing;
      (b) crash between state write and merge: replay skips the fold and
          re-runs only the idempotent merge;
      (c) a non-IVM writer advancing the snapshot raises a desync error
          instead of silently diverging."""
    import json
    import os

    from baum_welch_spark.streaming.upsert import (
        ivm_apply_batch,
        merge_batch,
        read_ivm_state,
        read_snapshot,
    )

    snap = str(tmp_path / "snap")
    group_map = spark.createDataFrame([(1, "g"), (2, "g"), (3, "g")], "k long, grp string")
    b1 = spark.createDataFrame(
        [(1, 10.0, "upsert", 1), (2, 20.0, "upsert", 1)],
        "k long, v double, op string, ts long",
    )
    ivm_apply_batch(spark, b1, snap, "k", "v", group_map, group_col="grp", n_buckets=4)
    st = read_ivm_state(snap)
    assert st["applied_gen"] == 1 and st["groups"]["g"] == [30.0, 2]

    # (a) full double-apply of the SAME batch: self-healing no-op fold
    ivm_apply_batch(spark, b1, snap, "k", "v", group_map, group_col="grp", n_buckets=4)
    st = read_ivm_state(snap)
    assert st["groups"]["g"] == [30.0, 2]  # NOT 60.0/4
    assert {r.k: r.v for r in read_snapshot(spark, snap).collect()} == {1: 10.0, 2: 20.0}

    # (b) crash between state write and merge: hand-write the post-fold
    # state for batch2 (applied_gen = gen+1 AND batch2's content
    # fingerprint, exactly as the real fold records), then replay the
    # protocol — the fold must be skipped (a second fold would add 30
    # again), the merge must still land
    from baum_welch_spark.streaming.upsert import collapse_delta

    b2 = spark.createDataFrame(
        [(3, 30.0, "upsert", 2), (1, 0.0, "delete", 2)],
        "k long, v double, op string, ts long",
    )
    st = read_ivm_state(snap)
    g_cur = json.load(open(os.path.join(snap, "_manifest.json")))["gen"]
    st["groups"]["g"] = [st["groups"]["g"][0] + 30.0 - 10.0, st["groups"]["g"][1]]
    st["applied_gen"] = g_cur + 1
    d2 = collapse_delta(b2, "k", ["v"], snapshot_dir=snap)
    st["pending_fp"] = int(
        d2.select(F.xxhash64(F.col("k"), F.col("op"), F.col("_d_v")).alias("h"))
        .agg(F.expr("bit_xor(h)").alias("x")).first().x
    )
    with open(os.path.join(snap, "_ivm_state.json"), "w") as f:
        json.dump(st, f)
    ivm_apply_batch(spark, b2, snap, "k", "v", group_map, group_col="grp", n_buckets=4)
    st = read_ivm_state(snap)
    got = {r.k: r.v for r in read_snapshot(spark, snap).collect()}
    assert got == {2: 20.0, 3: 30.0}
    assert st["groups"]["g"] == [50.0, 2]  # fold not re-applied

    # (c) non-IVM writer advances the snapshot -> desync raises
    merge_batch(
        spark,
        spark.createDataFrame([(9, 90.0, "upsert", 9)], "k long, v double, op string, ts long"),
        snap, "k", ["v"],
    )
    with pytest.raises(RuntimeError, match="desync"):
        ivm_apply_batch(
            spark,
            spark.createDataFrame([(2, 21.0, "upsert", 10)], "k long, v double, op string, ts long"),
            snap, "k", "v", group_map, group_col="grp", n_buckets=4,
        )


def test_stream_ivm_survives_fresh_checkpoint_and_int_groups(spark, tmp_path):
    """The two review-found defects as regressions: (1) a restart with a
    FRESH checkpoint (epoch ids reset to 0 — the documented
    schema-widening restart pattern) must keep folding new batches (a
    bare-epoch fence would skip them while still merging); (2) integer
    group columns must not fork into parallel int/str state entries
    across JSON save/load cycles."""
    from baum_welch_spark.streaming.upsert import (
        apply_cdc_stream_ivm,
        read_ivm_state,
        read_snapshot,
    )

    upd1 = str(tmp_path / "u1")
    upd2 = str(tmp_path / "u2")
    snap = str(tmp_path / "snap")
    group_map = spark.createDataFrame(
        [(k, k % 2) for k in range(1, 100)], "k long, grp long"  # INT groups
    )
    spark.createDataFrame(
        [(1, 10.0, "upsert", 1)], "k long, v double, op string, ts long"
    ).coalesce(1).write.mode("append").parquet(upd1)
    spark.createDataFrame(
        [(2, 20.0, "upsert", 2)], "k long, v double, op string, ts long"
    ).coalesce(1).write.mode("append").parquet(upd1)
    s1 = spark.readStream.schema("k long, v double, op string, ts long").option(
        "maxFilesPerTrigger", 1
    ).parquet(upd1)
    apply_cdc_stream_ivm(
        s1, snap, key="k", value_col="v", group_map=group_map, group_col="grp",
        checkpoint=str(tmp_path / "ck1"), n_buckets=4,
    ).awaitTermination(300)
    st = read_ivm_state(snap)
    assert st["groups"] == {"1": [10.0, 1], "0": [20.0, 1]}

    # fresh checkpoint + new source dir: epochs reset to 0; both new
    # batches must still fold
    spark.createDataFrame(
        [(3, 30.0, "upsert", 3)], "k long, v double, op string, ts long"
    ).coalesce(1).write.mode("append").parquet(upd2)
    spark.createDataFrame(
        [(4, 40.0, "upsert", 4)], "k long, v double, op string, ts long"
    ).coalesce(1).write.mode("append").parquet(upd2)
    s2 = spark.readStream.schema("k long, v double, op string, ts long").option(
        "maxFilesPerTrigger", 1
    ).parquet(upd2)
    apply_cdc_stream_ivm(
        s2, snap, key="k", value_col="v", group_map=group_map, group_col="grp",
        checkpoint=str(tmp_path / "ck2"), n_buckets=4,
    ).awaitTermination(300)
    st = read_ivm_state(snap)
    assert st["groups"] == {"1": [40.0, 2], "0": [60.0, 2]}
    rows = (
        read_snapshot(spark, snap).join(group_map, "k").groupBy("grp")
        .agg(F.sum("v").alias("s"), F.count("*").alias("n")).collect()
    )
    assert {str(r.grp): [float(r.s), r.n] for r in rows} == st["groups"]


def test_agg_delta_null_values_and_null_presence(spark, tmp_path):
    """NULL-value handling (review finding): a NULL upsert over an
    existing value must contribute -(old), a key whose stored value is
    NULL must still count as PRESENT (marker, not value-null-ness), and
    group sums never collect as None."""
    from baum_welch_spark.streaming.upsert import (
        agg_delta,
        collapse_delta,
        merge_batch,
    )

    snap = str(tmp_path / "snap")
    merge_batch(
        spark,
        spark.createDataFrame(
            [(1, 5.0, "upsert", 1), (2, None, "upsert", 1)],
            "k long, v double, op string, ts long",
        ),
        snap, "k", ["v"], n_buckets=4,
    )
    batch = spark.createDataFrame(
        [
            (1, None, "upsert", 2),   # value -> NULL: d_value = -5, count 0
            (2, 7.0, "upsert", 2),    # NULL -> 7: d_value = +7, count 0 (present!)
            (2, 0.0, "noop", 0),      # ignored by collapse (older ts)
        ],
        "k long, v double, op string, ts long",
    )
    d = collapse_delta(batch.filter("op != 'noop'"), "k", ["v"], n_buckets=4)
    rows = {r.k: (r.d_value, r.d_count) for r in agg_delta(spark, d, snap, "k", "v").collect()}
    assert rows == {1: (-5.0, 0), 2: (7.0, 0)}


def test_stream_restart_with_widened_schema(spark, tmp_path):
    """Schema evolution through the STREAM: run apply_cdc_stream with one
    value column, then restart the checkpointed stream with a widened
    column list over new change files — pre-widening rows null-backfill,
    widened rows carry the new column, and the checkpoint prevents
    re-application of the old files under the old schema."""
    from baum_welch_spark.streaming.upsert import apply_cdc_stream, read_snapshot

    upd1 = str(tmp_path / "upd1")
    upd2 = str(tmp_path / "upd2")
    snap = str(tmp_path / "snap")

    spark.createDataFrame(
        [(1, 10.0, "upsert", 1), (2, 20.0, "upsert", 1)],
        "k long, v double, op string, ts long",
    ).coalesce(1).write.mode("append").parquet(upd1)
    s1 = spark.readStream.schema("k long, v double, op string, ts long").parquet(upd1)
    apply_cdc_stream(
        s1, snap, key="k", value_cols=["v"], checkpoint=str(tmp_path / "ck1"),
        n_buckets=4,
    ).awaitTermination(300)

    # widened stream: new source dir + checkpoint (a stream's source schema
    # is fixed at start), SAME snapshot — the merge widens it
    spark.createDataFrame(
        [(2, 21.0, "hot", "upsert", 2), (3, 30.0, "cold", "upsert", 2)],
        "k long, v double, tag string, op string, ts long",
    ).coalesce(1).write.mode("append").parquet(upd2)
    s2 = spark.readStream.schema(
        "k long, v double, tag string, op string, ts long"
    ).parquet(upd2)
    apply_cdc_stream(
        s2, snap, key="k", value_cols=["v", "tag"],
        checkpoint=str(tmp_path / "ck2"),
    ).awaitTermination(300)

    got = {r.k: (r.v, r.tag) for r in read_snapshot(spark, snap).collect()}
    assert got == {1: (10.0, None), 2: (21.0, "hot"), 3: (30.0, "cold")}


def test_key_and_modulus_guards(spark, tmp_path):
    """Review-found guard gaps as regressions: (1) merging/compacting/
    diffing under a key column that contradicts the manifest-recorded one
    fails fast; (2) collapse_delta refuses to guess a bucket modulus —
    snapshot_dir resolves it from the manifest, a contradicting explicit
    value raises; (3) compact_snapshot preserves the retention horizon by
    default instead of GC'ing retained versions."""
    from baum_welch_spark.streaming.upsert import (
        collapse_delta,
        compact_snapshot,
        list_versions,
        merge_batch,
        read_snapshot_at,
        snapshot_diff,
    )

    snap = str(tmp_path / "snap")
    merge_batch(
        spark,
        spark.createDataFrame(
            [(1, 1.0, "upsert", 1), (2, 2.0, "upsert", 1)],
            "k long, v double, op string, ts long",
        ),
        snap, "k", ["v"], n_buckets=4, retain=4,
    )
    merge_batch(
        spark,
        spark.createDataFrame([(1, 1.5, "upsert", 2)], "k long, v double, op string, ts long"),
        snap, "k", ["v"], retain=4,
    )
    b = spark.createDataFrame([(9, 9.0, "upsert", 3)], "k long, v double, op string, ts long")
    # (1) wrong key fails fast everywhere
    with pytest.raises(ValueError, match="keyed on 'k'"):
        merge_batch(spark, b.withColumnRenamed("k", "kk"), snap, "kk", ["v"])
    with pytest.raises(ValueError, match="keyed on 'k'"):
        compact_snapshot(spark, snap, "v", n_buckets=8)
    with pytest.raises(ValueError, match="keyed on 'k'"):
        snapshot_diff(spark, snap, 1, 2, key="kk", value_cols=["v"])
    # (1b) a RE-TYPED key column fails fast like a re-typed value column
    # (ADVICE-r9: it would silently coerce in the merge join and write a
    # generation whose key type disagrees with the manifest schema)
    retyped = spark.createDataFrame(
        [("1", 9.0, "upsert", 3)], "k string, v double, op string, ts long"
    )
    with pytest.raises(ValueError, match="key column 'k' has type bigint"):
        merge_batch(spark, retyped, snap, "k", ["v"])
    # (2) collapse_delta: no guessing; manifest wins; contradiction raises
    with pytest.raises(ValueError, match="collapse_delta"):
        collapse_delta(b, "k", ["v"])
    d = collapse_delta(b, "k", ["v"], snapshot_dir=snap)
    assert d.select("_bucket").first()._bucket < 4
    with pytest.raises(ValueError, match="n_buckets=4"):
        collapse_delta(b, "k", ["v"], n_buckets=16, snapshot_dir=snap)
    # (3) compact with default retain keeps every retained version readable
    assert list_versions(snap) == [1, 2]
    compact_snapshot(spark, snap, "k", n_buckets=8)
    assert list_versions(snap) == [1, 2, 3]
    assert {r.k: r.v for r in read_snapshot_at(spark, snap, 1).collect()} == {1: 1.0, 2: 2.0}
    # explicit retain still shrinks
    compact_snapshot(spark, snap, "k", n_buckets=8, retain=1)
    assert list_versions(snap) == [4]


def test_stream_ivm_fingerprint_guards_changed_batch(spark, tmp_path):
    """The fence's batch fingerprint: a fold recorded for a batch whose
    merge never committed must REJECT a different arriving batch (crash +
    fresh-checkpoint restart with changed source composition) instead of
    silently skipping its fold — and still accept the original batch."""
    import json
    import os

    from baum_welch_spark.streaming.upsert import (
        ivm_apply_batch,
        read_ivm_state,
        read_snapshot,
    )

    snap = str(tmp_path / "snap")
    gm = spark.createDataFrame([(k, "g") for k in range(1, 10)], "k long, grp string")
    b1 = spark.createDataFrame(
        [(1, 10.0, "upsert", 1)], "k long, v double, op string, ts long"
    )
    ivm_apply_batch(spark, b1, snap, "k", "v", gm, group_col="grp", n_buckets=4)
    # simulate the crash window for b2: fold recorded (applied_gen bumped,
    # fingerprint stored), merge missing — write a WRONG fingerprint so a
    # differing replacement batch is detectable
    st = read_ivm_state(snap)
    st["applied_gen"] = 2
    st["pending_fp"] = 123456789  # not b3's fingerprint
    with open(os.path.join(snap, "_ivm_state.json"), "w") as f:
        json.dump(st, f)
    b3 = spark.createDataFrame(
        [(2, 20.0, "upsert", 2)], "k long, v double, op string, ts long"
    )
    with pytest.raises(RuntimeError, match="differs"):
        ivm_apply_batch(spark, b3, snap, "k", "v", gm, group_col="grp", n_buckets=4)
    # the snapshot was not merged by the failed call
    assert {r.k: r.v for r in read_snapshot(spark, snap).collect()} == {1: 10.0}
