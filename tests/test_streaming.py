"""Structured Streaming tests: drive the file-stream to completion with a
memory sink and compare against batch results."""

import pytest
from pyspark.sql import functions as F

from baum_welch_spark.sources.io import load_table
from baum_welch_spark.streaming.sessionize import (
    run_to_memory,
    session_agg,
    stream_events,
    windowed_event_counts,
)

from conftest import SF0001


def test_stream_windowed_counts_match_batch(spark):
    stream = windowed_event_counts(stream_events(spark, SF0001))
    run_to_memory(stream, "win_counts")
    got = {
        (r.w_start, r.event_type): (r.n, r.total_value)
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    batch = (
        load_table(spark, SF0001, "events")
        .groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(F.col("w.start").alias("w_start"), "event_type", "n", "total_value")
    )
    expect = {(r.w_start, r.event_type): (r.n, r.total_value) for r in batch.collect()}
    assert got == expect
    assert len(got) > 0


def test_stream_sessionize_total_events_preserved(spark):
    stream = session_agg(stream_events(spark, SF0001), gap="30 minutes")
    run_to_memory(stream, "sessions")
    rows = spark.sql("SELECT * FROM sessions").collect()
    assert sum(r.n_events for r in rows) == load_table(spark, SF0001, "events").count()
    for r in rows:
        assert r.session_end >= r.session_start


def test_stream_session_count_matches_batch_sessionize(spark):
    from baum_welch_spark.operators.relational import sessionize

    stream = session_agg(stream_events(spark, SF0001), gap="30 minutes")
    run_to_memory(stream, "sessions2")
    n_stream = spark.sql("SELECT count(*) AS n FROM sessions2").collect()[0].n
    n_batch = sessionize(load_table(spark, SF0001, "events"), gap_minutes=30).count()
    assert n_stream == n_batch


def test_stream_stream_join_matches_batch(spark):
    """Stream-stream view→purchase join over the finite file source must
    emit exactly the batch join's pairs."""
    from baum_welch_spark.streaming.join import view_purchase_stream_join

    joined = view_purchase_stream_join(stream_events(spark, SF0001), window_minutes=240)
    run_to_memory(joined, "ss_join", output_mode="append")
    got = {
        (r.purchase_id, r.view_id)
        for r in spark.sql("SELECT * FROM ss_join").collect()
    }
    ev = load_table(spark, SF0001, "events")
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"), F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    batch = v.join(
        p,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("v_ts") > F.col("p_ts") - F.expr("INTERVAL 240 MINUTES"))
        & (F.col("v_ts") <= F.col("p_ts")),
    )
    expect = {(r.purchase_id, r.view_id) for r in batch.collect()}
    assert got == expect
    assert len(expect) > 0


def test_stream_neardup_matches_batch_cross_pairs(spark):
    """Streamed docs probed against a static reference index must emit
    exactly the cross-corpus pairs the batch MinHash-LSH operator finds."""
    from baum_welch_spark.operators.dedup import minhash_lsh_pairs
    from baum_welch_spark.streaming.neardup import (
        build_reference_index,
        neardup_stream,
        stream_documents,
    )
    from baum_welch_spark.streaming.sessionize import run_to_memory

    docs = load_table(spark, SF0001, "documents")
    reference = docs.filter(F.col("doc_id") % 2 == 0)
    band_index, sets = build_reference_index(reference)

    stream = neardup_stream(
        stream_documents(spark, SF0001).filter(F.col("doc_id") % 2 == 1),
        band_index,
        sets,
    )
    run_to_memory(stream, "neardup_stream", output_mode="append")
    got = {
        (r.doc_id, r.ref_id, r.jaccard)
        for r in spark.sql("SELECT * FROM neardup_stream").collect()
    }

    # batch expectation: the union-corpus LSH pairs restricted to
    # (odd streamed doc, even reference doc), in that orientation
    batch = minhash_lsh_pairs(docs).collect()
    expect = set()
    for r in batch:
        a_odd, b_odd = r.doc_a % 2 == 1, r.doc_b % 2 == 1
        if a_odd and not b_odd:
            expect.add((r.doc_a, r.doc_b, r.jaccard))
        elif b_odd and not a_odd:
            expect.add((r.doc_b, r.doc_a, r.jaccard))
    assert got == expect
    assert len(got) > 0


def test_stream_decontaminate_matches_batch(spark):
    """Streamed docs checked against the static eval n-gram set must emit
    exactly the batch decontaminate results."""
    from baum_welch_spark.functions.columns import words
    from baum_welch_spark.operators.corpus import decontaminate
    from baum_welch_spark.operators.dedup import shingle_array
    from baum_welch_spark.streaming.neardup import decontaminate_stream, stream_documents
    from baum_welch_spark.streaming.sessionize import run_to_memory

    docs = load_table(spark, SF0001, "documents")
    # the batch op's eval side: distinct 5-grams of docs with doc_id % 50 == 0
    eval_grams = (
        docs.filter(F.col("doc_id") % 50 == 0)
        .select("doc_id", words("text").alias("ws"))
        .filter(F.size(F.col("ws")) >= 5)
        .select(F.explode(shingle_array(5)).alias("g"))
        .distinct()
    )
    stream = decontaminate_stream(
        stream_documents(spark, SF0001).filter(F.col("doc_id") % 50 != 0), eval_grams
    )
    run_to_memory(stream, "decontam_stream")  # complete mode (grouped agg)
    got = {
        (r.doc_id, r.n_overlap)
        for r in spark.sql("SELECT * FROM decontam_stream").collect()
    }
    expect = {(r.doc_id, r.n_overlap) for r in decontaminate(docs).collect()}
    assert got == expect
    assert len(got) > 0  # sf0.001 has planted cross-doc n-gram overlap


def test_stream_windowed_distinct_users_match_batch(spark):
    from baum_welch_spark.streaming.sessionize import windowed_distinct_users

    stream = windowed_distinct_users(stream_events(spark, SF0001), window="1 hour")
    run_to_memory(stream, "win_distinct")
    got = {
        (r.w_start, r.event_type): r.n_users_approx
        for r in spark.sql("SELECT * FROM win_distinct").collect()
    }
    batch = (
        load_table(spark, SF0001, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.approx_count_distinct("user_id", rsd=0.02).alias("n"))
    )
    expect = {(r["w"]["start"], r["event_type"]): r["n"] for r in batch.collect()}
    # HLL merge is order-insensitive -> streaming == batch exactly
    assert got == expect and len(got) > 0
    # sketch accuracy: within 5% of true distinct counts
    true = (
        load_table(spark, SF0001, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.countDistinct("user_id").alias("n"))
    )
    for r in true.collect():
        approx = got[(r["w"]["start"], r["event_type"])]
        assert abs(approx - r["n"]) <= max(2, 0.05 * r["n"])


def test_stream_windowed_cms_matches_batch_and_estimates(spark):
    from baum_welch_spark.operators.sketches import CMS_DEPTH, CMS_WIDTH, _probe_cols
    from baum_welch_spark.streaming.heavyhitters import windowed_cms

    stream = windowed_cms(stream_events(spark, SF0001), key="event_type")
    run_to_memory(stream, "win_cms")
    got = {
        (r.w_start, r.row, r.bucket): r.cnt
        for r in spark.sql("SELECT * FROM win_cms").collect()
    }
    events = load_table(spark, SF0001, "events")
    batch = (
        events.select("ts", *_probe_cols("event_type"))
        .select(
            "ts",
            F.explode(
                F.array(*[
                    F.struct(F.lit(i).alias("row"), F.col(f"b{i}").alias("bucket"))
                    for i in range(CMS_DEPTH)
                ])
            ).alias("p"),
        )
        .groupBy(F.window("ts", "1 hour").alias("w"), "p.row", "p.bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    expect = {(r["w"]["start"], r["row"], r["bucket"]): r["cnt"] for r in batch.collect()}
    assert got == expect and len(got) > 0
    # per-window state is geometry-bounded
    from collections import Counter

    per_window = Counter(w for (w, _, _) in got)
    assert max(per_window.values()) <= CMS_DEPTH * CMS_WIDTH
    # CMS point estimates from the materialized sketch never undercount
    w0 = min(w for (w, _, _) in got)
    true_counts = {
        r["event_type"]: r["n"]
        for r in events.where(F.window("ts", "1 hour")["start"] == w0)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    sketch = {(r, b): c for (w, r, b), c in got.items() if w == w0}
    import hashlib

    def probe(token, i):
        h = int(hashlib.md5(token.encode()).hexdigest()[:15], 16)
        h1, h2 = h % (1 << 30), h >> 30
        return (h1 + i * h2) % CMS_WIDTH

    for tok, n in true_counts.items():
        est = min(sketch.get((i, probe(tok, i)), 0) for i in range(CMS_DEPTH))
        assert est >= n


def test_spend_alert_stream_matches_batch_first_crossing(spark):
    from pyspark.sql import Window

    from baum_welch_spark.streaming.alerts import spend_alert_stream

    threshold = 500.0
    stream = spend_alert_stream(stream_events(spark, SF0001), threshold=threshold)
    run_to_memory(stream, "alerts", output_mode="append")
    got = {
        r.user_id: (r.event_id, r.total_after)
        for r in spark.sql("SELECT * FROM alerts").collect()
    }
    events = load_table(spark, SF0001, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    batch = (
        events.where(F.col("event_type") == "purchase")
        .withColumn("cum", F.sum("value").over(w))
        .where(F.col("cum") >= threshold)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_id", F.round("cum", 4).alias("total_after"))
    )
    expect = {r.user_id: (r.event_id, r.total_after) for r in batch.collect()}
    assert got == expect
    assert len(got) > 0


def test_spend_alert_tws_variant_skips_or_matches(spark):
    """The transformWithStateInPandas variant runs only where protobuf
    exists; otherwise verify it raises the documented ImportError."""
    from baum_welch_spark.streaming.alerts import (
        spend_alert_stream_tws,
        tws_available,
    )

    if not tws_available():
        with pytest.raises(ImportError):
            spend_alert_stream_tws(stream_events(spark, SF0001))
        return
    stream = spend_alert_stream_tws(stream_events(spark, SF0001), threshold=500.0)
    run_to_memory(stream, "alerts_tws", output_mode="append")
    assert spark.sql("SELECT count(*) AS n FROM alerts_tws").collect()[0].n > 0


def test_stream_trending_topk_matches_batch(spark):
    from baum_welch_spark.streaming.sessionize import run_to_memory, stream_events
    from baum_welch_spark.streaming.trending import topk_per_window, trending_counts

    stream = trending_counts(stream_events(spark, SF0001))
    run_to_memory(stream, "trending_counts_sink")
    got = {
        (r.w_start, r.key): (r.cnt, r.rk)
        for r in topk_per_window(spark.sql("SELECT * FROM trending_counts_sink")).collect()
    }
    batch_counts = (
        load_table(spark, SF0001, "events")
        .groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"),
                 F.col("event_type").alias("key"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("w.start").alias("w_start"), F.col("w.end").alias("w_end"), "key", "cnt")
    )
    expect = {
        (r.w_start, r.key): (r.cnt, r.rk)
        for r in topk_per_window(batch_counts).collect()
    }
    assert got == expect
    assert len(got) > 0
    # sliding windows: every event timestamp is covered by 2 windows, so
    # there are ~2x as many (window, key) sink rows as tumbling would give
    n_windows = spark.sql("SELECT count(DISTINCT w_start) AS n FROM trending_counts_sink").collect()[0].n
    assert n_windows >= 2


def test_session_window_exact_gap_boundary_matches_oracle(spark, tmp_path):
    """Pin the sessions_stream gap-boundary convention on BOTH sides: an
    event landing EXACTLY at the open session's end (last ts + gap) still
    MERGES in Spark's session_window (adjacency merges — this test caught
    the oracle's `>=` draft), while one microsecond past it starts a new
    session. The DuckDB twin must agree row-for-row."""
    import duckdb

    from baum_welch_spark.streaming.sessionize import (
        run_to_memory,
        session_agg,
        sessions_stream_sql,
    )

    rows = [
        (1, "2024-01-01 00:00:00", 10.0, 1),
        (1, "2024-01-01 00:10:00", 10.0, 2),
        (1, "2024-01-01 00:40:00", 10.0, 3),  # exactly gap after #2 -> MERGES
        (1, "2024-01-01 01:10:00.000001", 10.0, 4),  # 1us past end -> NEW
        (2, "2024-01-01 00:00:00", 5.0, 5),
    ]
    src = str(tmp_path / "events")
    df = spark.createDataFrame(
        [(e, t, u, "click", v, "{}") for u, t, v, e in rows],
        "event_id bigint, ts string, user_id bigint, event_type string, value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    df.write.parquet(src)

    stream = (
        spark.readStream.schema(df.schema)
        .parquet(src)
        .transform(lambda d: session_agg(d, gap="30 minutes"))
    )
    run_to_memory(stream, "gap_boundary_face", output_mode="complete")
    got = sorted(
        (r.user_id, r.session_start.isoformat(), r.n_events)
        for r in spark.sql("SELECT * FROM gap_boundary_face").collect()
    )
    assert got == [
        (1, "2024-01-01T00:00:00", 3),
        (1, "2024-01-01T01:10:00.000001", 1),
        (2, "2024-01-01T00:00:00", 1),
    ]

    con = duckdb.connect()
    df.toPandas().to_parquet(str(tmp_path / "e.parquet"))
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{tmp_path}/e.parquet'")
    want = sorted(
        (u, s, n) for u, s, _, n, _ in con.sql(sessions_stream_sql(30)).fetchall()
    )
    spark_rows = sorted(
        (r.user_id, r.start_us, r.n_events)
        for r in spark.sql(
            "SELECT user_id, unix_micros(session_start) AS start_us, n_events "
            "FROM gap_boundary_face"
        ).collect()
    )
    assert spark_rows == want


def test_stateful_width_sizes_from_source_volume(spark, tmp_path):
    """VERDICT-r13 #7: the width helper must size from the face's ACTUAL
    stream source, sum part files for directory parquet (getsize on a dir
    returns the inode size — the silent width-8 regression ADVICE r13
    flagged), keep width 8 for unreadable/missing sources, and honor an
    explicit n= pin."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from __spark_entry__ import _stateful_width

    def width_under(**kw):
        with _stateful_width(spark, **kw):
            return int(spark.conf.get("spark.sql.shuffle.partitions"))

    # single small file -> 8
    small = tmp_path / "small"
    small.mkdir()
    (small / "events.parquet").write_bytes(b"x" * 1024)
    assert width_under(sf_dir=str(small)) == 8

    # single large file -> 32
    big = tmp_path / "big"
    big.mkdir()
    (big / "events.parquet").write_bytes(b"x" * (33 << 20))
    assert width_under(sf_dir=str(big)) == 32

    # DIRECTORY parquet whose part files sum past the threshold -> 32
    # (the getsize-on-a-dir trap: inode size is ~4 KB regardless of content)
    spark_dir = tmp_path / "sparkdir"
    (spark_dir / "events.parquet").mkdir(parents=True)
    for i in range(3):
        (spark_dir / "events.parquet" / f"part-{i}.parquet").write_bytes(
            b"x" * (12 << 20)
        )
    assert width_under(sf_dir=str(spark_dir)) == 32

    # a different source name is honored
    alt = tmp_path / "alt"
    alt.mkdir()
    (alt / "changes.parquet").write_bytes(b"x" * (33 << 20))
    assert width_under(sf_dir=str(alt)) == 8  # default source absent -> 8
    assert width_under(sf_dir=str(alt), source="changes.parquet") == 32

    # explicit pin wins regardless of volume
    assert width_under(sf_dir=str(big), n=8) == 8

    # the real sf0.1 events stream (>= 32 MB) plans at 32, sf0.01 at 8
    import os.path

    sf01 = "/root/testdata/sf0.1"
    if os.path.exists(os.path.join(sf01, "events.parquet")):
        expected = 32 if os.path.getsize(os.path.join(sf01, "events.parquet")) >= (32 << 20) else 8
        assert width_under(sf_dir=sf01) == expected
    assert width_under(sf_dir="/root/testdata/sf0.01") == 8
