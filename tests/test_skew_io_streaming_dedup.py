"""Tests for skew-aware patterns (salted agg/join), multi-format IO, and
streaming dedup — each asserted equal to its unsalted / batch / parquet
twin, which is the whole contract."""

import shutil

import pytest
from pyspark.sql import functions as F

from baum_welch_spark.operators.skew import salted_agg, salted_join, user_value_stats_salted
from baum_welch_spark.plans.audit import plan_report
from baum_welch_spark.sources.io import FORMATS, load_table, read_table, write_table

from conftest import SF0001


@pytest.fixture(scope="module")
def events(spark):
    return load_table(spark, SF0001, "events").cache()


# -- salted aggregation ------------------------------------------------------


def test_salted_agg_matches_plain_groupby(spark, events):
    got = {r.event_type: r.asDict() for r in user_value_stats_salted(events, n_salt=8).collect()}
    plain = (
        events.groupBy("event_type")
        .agg(
            F.count("event_id").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
            F.round(F.min("value"), 6).alias("min_value"),
            F.round(F.max("value"), 6).alias("max_value"),
        )
        .collect()
    )
    assert len(got) == len(plain) > 0
    for r in plain:
        g = got[r.event_type]
        assert g["n_events"] == r.n_events
        assert abs(g["total_value"] - r.total_value) < 1e-3
        assert g["min_value"] == r.min_value and g["max_value"] == r.max_value


def test_salted_agg_rejects_non_mergeable(spark, events):
    with pytest.raises(ValueError, match="non-mergeable"):
        salted_agg(events, ["event_type"], "event_id", {"m": ("avg", "value")})


def test_salted_agg_two_shuffles(spark, events):
    df = salted_agg(events, ["event_type"], "event_id", {"n": ("count", "event_id")}, n_salt=8)
    rep = plan_report(df)
    assert rep["shuffles"] <= 2, rep


# -- salted join -------------------------------------------------------------


def test_salted_join_matches_plain_join(spark, events):
    dim = spark.createDataFrame(
        [("view", 1.0), ("click", 2.0), ("purchase", 10.0), ("signup", 5.0), ("share", 3.0)],
        schema="event_type string, weight double",
    )
    # plain join keyed on the (skewed) event_type
    plain = events.join(dim, "event_type").select("event_id", "weight")
    salted = salted_join(events, dim, "event_type", n_salt=8).select("event_id", "weight")
    p = {(r.event_id, r.weight) for r in plain.collect()}
    s = {(r.event_id, r.weight) for r in salted.collect()}
    assert p == s and len(p) > 0


# -- multi-format IO ---------------------------------------------------------


@pytest.mark.parametrize("fmt", FORMATS)
def test_events_roundtrip_all_formats(spark, events, fmt, tmp_path):
    path = str(tmp_path / f"events_{fmt}")
    write_table(events, path, fmt=fmt)
    back = read_table(spark, path, fmt, events.schema)
    cols = ["event_id", "ts", "user_id", "event_type", "value"]
    a = {tuple(r) for r in events.select(cols).collect()}
    b = {tuple(r) for r in back.select(cols).collect()}
    assert a == b


def test_csv_rejects_array_columns(spark, tmp_path):
    emb = load_table(spark, SF0001, "embeddings")
    with pytest.raises(ValueError, match="CSV cannot hold"):
        write_table(emb, str(tmp_path / "emb_csv"), fmt="csv")


def test_unknown_format_rejected(spark, events, tmp_path):
    with pytest.raises(ValueError, match="unsupported format"):
        write_table(events, str(tmp_path / "x"), fmt="avro")


# -- streaming dedup ---------------------------------------------------------


def test_stream_dedup_drops_duplicated_stream(spark, tmp_path):
    """The same events file landed twice (replayed upstream) must dedup back
    to exactly the batch-distinct set of event_ids."""
    from baum_welch_spark.streaming.dedup import dedup_stream, stream_events_dir
    from baum_welch_spark.streaming.sessionize import run_to_memory

    src = str(tmp_path / "dup_stream")
    (tmp_path / "dup_stream").mkdir()
    shutil.copy(f"{SF0001}/events.parquet", src + "/a.parquet")
    shutil.copy(f"{SF0001}/events.parquet", src + "/b.parquet")

    deduped = dedup_stream(stream_events_dir(spark, src), watermark="24 hours")
    run_to_memory(deduped, "dedup_events", output_mode="append")
    got = spark.sql("SELECT event_id FROM dedup_events").collect()
    n_batch = load_table(spark, SF0001, "events").count()
    assert len(got) == n_batch  # 2x input rows -> exactly one per event_id
    assert len({r.event_id for r in got}) == n_batch


def test_streaming_reference_index_equals_batch_banded_signatures(spark):
    """The shared-banding claim made concrete: the streaming reference
    index (streaming.neardup.build_reference_index) must be row-identical
    to the batch banded_signatures frame — a drift between the two would
    make streamed docs silently stop colliding with batch-built buckets."""
    from baum_welch_spark.operators.dedup import banded_signatures
    from baum_welch_spark.sources.io import load_table
    from baum_welch_spark.streaming.neardup import build_reference_index

    from conftest import SF0001

    docs = load_table(spark, SF0001, "documents")
    band_index, _sets = build_reference_index(docs)
    streaming_rows = {
        (r.ref_id, r.band, r.bkey) for r in band_index.collect()
    }
    batch_rows = {
        (r.doc_id, r.band, r.bkey) for r in banded_signatures(docs).collect()
    }
    assert streaming_rows == batch_rows and streaming_rows


def test_skew_report_flags_the_planted_hot_key(spark):
    """A key holding half the rows must dominate every hot-key statistic;
    a uniform column must sit near skew_ratio 1."""
    from baum_welch_spark.operators.skew import skew_report

    rows = [(1, "hot") for _ in range(500)] + [
        (1000 + i, f"u{i % 50}") for i in range(500)
    ]
    df = spark.createDataFrame(rows, "k bigint, g string")
    rep = {r.key_col: r for r in skew_report(df, ["k", "g"]).collect()}
    hot = rep["k"]
    assert hot.top_key == "1" and hot.top_count == 500
    assert hot.top_share == 0.5
    assert hot.skew_ratio > 100  # 500 rows on one key vs ~1 per uniform key
    assert rep["g"].skew_ratio < hot.skew_ratio
    assert hot.n_rows == 1000 and rep["g"].n_rows == 1000


def test_skew_report_deterministic_top_key_tiebreak(spark):
    """Equal-count keys must resolve to the MIN key string — the face's
    DuckDB-exactness depends on both engines picking the same row."""
    from baum_welch_spark.operators.skew import skew_report

    df = spark.createDataFrame(
        [("b",), ("a",), ("c",)], "k string"
    )
    r = skew_report(df, ["k"]).collect()[0]
    assert r.top_key == "a" and r.top_count == 1


def test_skew_report_rejects_empty_key_list(spark, events):
    from baum_welch_spark.operators.skew import skew_report

    with pytest.raises(ValueError, match="at least one"):
        skew_report(events, [])


def test_skew_report_single_count_shuffle_per_column(spark, events):
    """Plan shape: profiling cost must be one map-side-combined count
    shuffle per key column plus the one-row summary — no joins at all."""
    from baum_welch_spark.operators.skew import skew_report

    rep = plan_report(skew_report(events, ["user_id"]))
    assert rep["nested_loop_joins"] == 0, rep
    assert rep.get("joins", 0) == 0 or rep["broadcast_joins"] == rep.get("joins", 0), rep
