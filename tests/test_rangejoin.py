"""Range-join (point-in-interval) tests: bucketed equi-join vs a naive
cross-join oracle, bucket-edge cases, and the no-cartesian plan guarantee
that is the operator's whole reason to exist (rangejoin.py docstring)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from baum_welch_spark.operators.rangejoin import point_in_interval_join, purchase_view_context
from baum_welch_spark.plans.audit import plan_report
from baum_welch_spark.sources.io import load_table

from conftest import SF0001


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def points(spark):
    return spark.createDataFrame(
        [
            (1, _ts("2024-01-01 00:00:00")),
            (2, _ts("2024-01-01 00:04:59")),
            (3, _ts("2024-01-01 00:05:00")),  # exactly at an interval end
            (4, _ts("2024-01-01 00:05:00.000001")),  # just past it
            (5, _ts("2024-01-01 00:10:00")),  # exactly at an interval start
            (6, _ts("2024-01-01 02:00:00")),  # far outside everything
        ],
        schema="p_id bigint, ts timestamp",
    )


@pytest.fixture(scope="module")
def intervals(spark):
    return spark.createDataFrame(
        [
            (10, _ts("2023-12-31 23:59:00"), _ts("2024-01-01 00:05:00")),
            (11, _ts("2024-01-01 00:10:00"), _ts("2024-01-01 00:20:00")),
            (12, _ts("2024-01-01 00:00:00"), _ts("2024-01-01 01:00:00")),  # spans many buckets
            (13, _ts("2024-01-01 03:00:00"), _ts("2024-01-01 03:01:00")),  # matches nothing
        ],
        schema="iv_id bigint, start timestamp, end timestamp",
    )


def _naive(points, intervals):
    return {
        (r.iv_id, r.p_id)
        for r in intervals.crossJoin(points)
        .filter((F.col("ts") > F.col("start")) & (F.col("ts") <= F.col("end")))
        .collect()
    }


@pytest.mark.parametrize("bucket_seconds", [60, 300, 3600])
def test_point_in_interval_matches_naive_across_bucket_widths(
    spark, points, intervals, bucket_seconds
):
    """Result must be bucket-width-invariant and equal to the cross-join
    oracle — including the open-start/closed-end edges and the sub-second
    point just past an interval end."""
    got = {
        (r.iv_id, r.p_id)
        for r in point_in_interval_join(
            points, intervals, "ts", "start", "end", bucket_seconds=bucket_seconds
        ).collect()
    }
    assert got == _naive(points, intervals)


def test_left_interval_keeps_unmatched_intervals(spark, points, intervals):
    rows = point_in_interval_join(
        points, intervals, "ts", "start", "end",
        bucket_seconds=300, how="left_interval", interval_key="iv_id",
    ).collect()
    by_iv = {}
    for r in rows:
        by_iv.setdefault(r.iv_id, set()).add(r.p_id)
    assert by_iv[13] == {None}  # unmatched interval survives with null point
    inner = _naive(points, intervals)
    got_inner = {(iv, p) for iv, ps in by_iv.items() for p in ps if p is not None}
    assert got_inner == inner
    # SQL left-join cardinality: matched intervals contribute their matches
    # ONLY (no extra null rows for non-matching buckets — interval 12 spans
    # 13 buckets but must not emit 13 rows); each unmatched interval (11 and
    # 13 — point 5 sits exactly at 11's open start) exactly one null row
    matched_ivs = {iv for iv, _ in inner}
    n_intervals = intervals.count()
    assert len(rows) == len(inner) + (n_intervals - len(matched_ivs))
    for iv_id, ps in by_iv.items():
        if iv_id in matched_ivs:
            assert None not in ps
        else:
            assert ps == {None}


def test_rangejoin_plan_has_no_cartesian(spark, points, intervals):
    """The entire point of the bucketing: the plan must be an equi-join
    (shuffled hash / sort-merge / broadcast-HASH), never a nested-loop or
    cartesian product."""
    df = point_in_interval_join(points, intervals, "ts", "start", "end", bucket_seconds=300)
    rep = plan_report(df)
    assert rep["nested_loop_joins"] == 0, rep


def test_purchase_view_context_counts(spark):
    """sf0.001 events: every purchase appears exactly once, and counts match
    a naive per-purchase filter on the collected events."""
    events = load_table(spark, SF0001, "events").cache()
    got = {r.purchase_id: r.n_views for r in purchase_view_context(events).collect()}
    rows = events.select("event_id", "user_id", "event_type", "ts").collect()
    views = sorted(r.ts for r in rows if r.event_type == "view")
    import bisect

    for r in rows:
        if r.event_type != "purchase":
            continue
        lo = bisect.bisect_right(views, r.ts - dt.timedelta(minutes=5))
        hi = bisect.bisect_right(views, r.ts)
        assert got[r.event_id] == hi - lo, f"purchase {r.event_id}"
    assert len(got) == sum(1 for r in rows if r.event_type == "purchase")
