"""Stateful streaming EWMA: the streaming twin of
:func:`..operators.timeseries.ewma_user_spend` — per-user daily purchase
spend smoothed by the same recursion, computed incrementally as events
arrive, with O(1) state per key (current open day's accumulator + the
previous day's smoothed value). The recursive-state window op that batch
SQL frames cannot express is exactly the op streaming state holds
naturally — the pairing this module demonstrates.

Batch-equivalence: the latest emitted row per (user, day) must equal the
batch operator's output row for row — the face shares the batch oracle
(``EWMA_USER_SPEND_SQL``) verbatim. Two conventions make that exact:

- day sums are rounded HALF_UP at 4 dp like Spark's ``F.round`` — via
  ``decimal.Decimal(repr(x))``: Catalyst's Round on doubles goes through
  ``BigDecimal.valueOf`` (shortest round-trip repr, which Python's
  ``repr`` reproduces), not the exact binary expansion and not Python's
  half-even ``round``;
- NULL purchase values are skipped like ``F.sum`` skips nulls (a NaN
  reaching the accumulator would poison every later EWMA for the key);
  a day whose EVERY purchase value is NULL emits spend 0.0 here (the
  accumulator never moves), and since ADVICE r11 the batch operator and
  the shared oracle COALESCE that day's NULL sum to 0.0 too — the
  formerly-documented residual divergence is closed, all three engines
  agree;
- the recursion is the same two-multiplies-one-add on the rounded spends,
  emitted UNROUNDED (the batch module's lesson: identical inputs +
  identical op order needs no rounding convention).

Ordering contract (the :mod:`.score` discipline): events apply in
(ts, event_id) order within each micro-batch; an event at or before the
last applied position is DROPPED and counted (``n_late``) — a day that
already closed cannot be reopened without rewinding the recursion.

Emission (update mode): every batch re-emits the open day's PROVISIONAL
row (smoothed as if the day were complete — on a finite source the last
batch's provisional row IS the final row, since a stateful operator never
observes end-of-stream) plus the FINAL row of any day the batch closed; a
monotone per-user ``ver`` lets the reader keep the latest row per
(user, day).
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal
from typing import Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from baum_welch_spark.streaming.score import _ts_us

OUTPUT_SCHEMA = (
    "user_id bigint, day string, spend double, ewma_spend double, "
    "ver bigint, n_late bigint"
)
STATE_SCHEMA = (
    "cur_day string, accum double, prev_ewma double, has_prev boolean, "
    "last_ts_us bigint, last_eid bigint, n_late bigint, ver bigint"
)


def _round4_half_up(x: float) -> float:
    """``F.round(x, 4)`` semantics: Catalyst's Round on DoubleType goes
    through ``BigDecimal.valueOf`` = ``Double.toString`` = the SHORTEST
    round-trip decimal repr, then HALF_UP — so the match is
    ``Decimal(repr(x))`` (Python's repr is the same shortest repr), NOT
    ``Decimal(x)`` (the exact binary expansion, which disagrees on
    ~1-in-300k 5-dp halfway values like 788.72335: exact expansion
    ...349999 rounds DOWN, shortest repr rounds UP)."""
    return float(Decimal(repr(x)).quantize(Decimal("0.0001"), rounding=ROUND_HALF_UP))


def ewma_stream_updater(alpha: float = 0.5):
    """Build the applyInPandasWithState function."""
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    one_minus = 1.0 - alpha

    def update(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            (cur_day, accum, prev_ewma, has_prev,
             last_ts_us, last_eid, n_late, ver) = state.get
        else:
            cur_day, accum, prev_ewma, has_prev = None, 0.0, 0.0, False
            last_ts_us, last_eid, n_late, ver = None, None, 0, 0

        def smooth(spend_r: float) -> float:
            return one_minus * prev_ewma + alpha * spend_r if has_prev else spend_r

        out_user, out_day, out_spend, out_ewma, out_ver = [], [], [], [], []

        def emit(day: str, spend_r: float, ewma: float) -> None:
            nonlocal ver
            ver += 1
            out_user.append(key[0])
            out_day.append(day)
            out_spend.append(spend_r)
            out_ewma.append(ewma)
            out_ver.append(ver)

        rows = pd.concat(list(pdfs))
        rows = rows.sort_values(["ts", "event_id"])
        for ts_v, eid, val in zip(rows["ts"], rows["event_id"], rows["value"]):
            pos = (_ts_us(ts_v), int(eid))
            if last_ts_us is not None and pos <= (last_ts_us, last_eid):
                n_late += 1
                continue
            last_ts_us, last_eid = pos
            day = str(pd.Timestamp(ts_v).date())
            if cur_day is not None and day > cur_day:
                # the open day closed: fold its rounded sum into the
                # recursion and emit its final row
                spend_r = _round4_half_up(accum)
                ewma = smooth(spend_r)
                emit(cur_day, spend_r, ewma)
                prev_ewma, has_prev = ewma, True
                accum = 0.0
            cur_day = day
            # F.sum semantics: nulls contribute nothing (the position was
            # still applied above, and the day is still opened)
            if not pd.isna(val):
                accum += float(val)
        if cur_day is not None:
            # provisional row for the (still open) current day
            spend_r = _round4_half_up(accum)
            emit(cur_day, spend_r, smooth(spend_r))
        state.update(
            (cur_day, accum, prev_ewma, has_prev, last_ts_us, last_eid, n_late, ver)
        )
        yield pd.DataFrame(
            {
                "user_id": out_user,
                "day": out_day,
                "spend": out_spend,
                "ewma_spend": out_ewma,
                "ver": out_ver,
                "n_late": [n_late] * len(out_ver),
            }
        )

    return update


def ewma_stream(events: DataFrame, alpha: float = 0.5) -> DataFrame:
    """Purchase-events stream -> per-user running daily EWMA rows.

    Scale: state shuffles once on user_id and stays partitioned; each key
    holds one open-day accumulator + one double of smoothing state,
    bounded regardless of stream length (the exact streaming analogue of
    the batch op's O(1)-per-chain posture). No watermark needed — state
    never grows with time; out-of-order events past an applied position
    are dropped and counted rather than corrupting the recursion.
    """
    return (
        events.filter(events.event_type == "purchase")
        .select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            ewma_stream_updater(alpha),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
