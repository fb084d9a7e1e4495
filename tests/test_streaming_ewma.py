"""Stateful streaming EWMA vs the batch recursive operator."""

import pandas as pd
import pytest

from baum_welch_spark.operators.timeseries import ewma_user_spend
from baum_welch_spark.sources.io import load_table
from baum_welch_spark.streaming.ewma import ewma_stream, ewma_stream_updater
from baum_welch_spark.streaming.sessionize import run_to_memory, stream_events

from conftest import SF0001


class _FakeState:
    def __init__(self):
        self._v = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)


def _batch(ids, ts, vals):
    return pd.DataFrame({"user_id": [7] * len(ids), "event_id": ids, "ts": ts, "value": vals})


DAY1 = pd.Timestamp("2024-01-01 10:00:00")
DAY2 = pd.Timestamp("2024-01-02 09:00:00")
DAY3 = pd.Timestamp("2024-01-03 08:00:00")


def test_updater_day_close_and_provisional_rows():
    update = ewma_stream_updater(alpha=0.5)
    state = _FakeState()
    # batch 1: two events on day 1 -> one provisional row
    out1 = pd.concat(list(update((7,), iter([_batch([1, 2], [DAY1, DAY1], [2.0, 3.0])]), state)))
    assert list(out1["day"]) == ["2024-01-01"]
    assert out1["spend"].iloc[0] == 5.0 and out1["ewma_spend"].iloc[0] == 5.0
    # batch 2: day 2 event closes day 1 (final row re-emitted) + provisional day 2
    out2 = pd.concat(list(update((7,), iter([_batch([3], [DAY2], [1.0])]), state)))
    assert list(out2["day"]) == ["2024-01-01", "2024-01-02"]
    assert out2["ewma_spend"].tolist() == [5.0, 0.5 * 5.0 + 0.5 * 1.0]
    # batch 3: more day-2 spend revises the provisional row; day 3 closes it
    out3 = pd.concat(list(update((7,), iter([_batch([4, 5], [DAY2 + pd.Timedelta("1h"), DAY3], [2.0, 4.0])]), state)))
    assert list(out3["day"]) == ["2024-01-02", "2024-01-03"]
    d2 = 0.5 * 5.0 + 0.5 * 3.0
    assert out3["ewma_spend"].tolist() == [d2, 0.5 * d2 + 0.5 * 4.0]
    # versions are strictly increasing so the reader can keep latest per day
    assert out1["ver"].tolist() + out2["ver"].tolist() + out3["ver"].tolist() == [1, 2, 3, 4, 5]


def test_updater_drops_late_events_counted():
    update = ewma_stream_updater(alpha=0.5)
    state = _FakeState()
    list(update((7,), iter([_batch([1], [DAY2], [4.0])]), state))
    # an event from day 1 after day 2 was applied: dropped, counted
    out = pd.concat(list(update((7,), iter([_batch([2], [DAY1], [9.0])]), state)))
    assert out["n_late"].iloc[0] == 1
    # day-2 provisional value unchanged
    assert out["day"].tolist() == ["2024-01-02"]
    assert out["spend"].iloc[0] == 4.0


def test_round4_matches_spark_f_round_on_halfway_values(spark):
    """Catalyst's Round(double) goes through BigDecimal.valueOf (shortest
    repr); Decimal(exact-binary-expansion) disagrees on 5-dp halfway values
    — 788.72335's nearest double is ...349999 so exact-expansion rounds
    DOWN while valueOf rounds UP. Pin _round4_half_up to the Spark result
    on exactly those adversarial inputs."""
    from pyspark.sql import functions as F

    from baum_welch_spark.streaming.ewma import _round4_half_up

    vals = [788.72335, 539.61745, 168.14495, 0.00005, 2.5, 1.00015, 123.4]
    df = spark.createDataFrame([(v,) for v in vals], "x double").select(
        F.round("x", 4).alias("r")
    )
    expect = [r.r for r in df.collect()]
    got = [_round4_half_up(v) for v in vals]
    assert got == expect, list(zip(vals, got, expect))


def test_updater_rejects_bad_alpha_and_skips_null_values():
    import numpy as np

    with pytest.raises(ValueError):
        ewma_stream_updater(alpha=0.0)
    update = ewma_stream_updater(alpha=0.5)
    state = _FakeState()
    # a NULL purchase value must not NaN-poison the accumulator
    out = pd.concat(list(update(
        (7,),
        iter([_batch([1, 2], [DAY1, DAY1], [2.0, np.nan])]),
        state,
    )))
    assert out["spend"].iloc[0] == 2.0
    assert out["ewma_spend"].iloc[0] == 2.0


def test_streaming_ewma_matches_batch_exactly(spark):
    stream = ewma_stream(stream_events(spark, SF0001))
    run_to_memory(stream, "ewma_stream_t", output_mode="update")
    got = {
        (r.user_id, r.day): (r.spend, r.ewma_spend)
        for r in spark.sql(
            "SELECT user_id, day, spend, ewma_spend FROM ("
            "  SELECT *, row_number() OVER (PARTITION BY user_id, day ORDER BY ver DESC) rn"
            "  FROM ewma_stream_t) WHERE rn = 1"
        ).collect()
    }
    batch = ewma_user_spend(load_table(spark, SF0001, "events")).collect()
    assert len(got) == len(batch) > 0
    for r in batch:
        s, e = got[(r.user_id, r.day)]
        assert s == r.spend, (r.user_id, r.day)
        assert e == r.ewma_spend, (r.user_id, r.day)
