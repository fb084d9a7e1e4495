"""Stateful streaming alerts: per-user cumulative purchase spend with a
one-shot threshold alert.

State per user is two scalars (running total + fired flag) — bounded state
per key. The alert fires exactly once per user, on the event whose running
total first reaches the threshold (events applied in (ts, event_id) order
within each batch, so the finite-source result is deterministic and equals
the batch cumulative-sum computation — tested).

Two implementations of the same semantics:

- ``spend_alert_stream`` — ``applyInPandasWithState`` (same API as the
  streaming HMM scorer in ``streaming/score.py``); works everywhere.
- ``spend_alert_stream_tws`` — Spark 4's ``transformWithStateInPandas``
  successor API with typed ``ValueState``. Its Python state server needs
  ``google.protobuf``, absent in this container, so the face is
  import-gated and its test skips where the dependency is missing.

Scale: one shuffle keyed by user_id; state store holds 2 scalars per user.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

ALERT_SCHEMA = "user_id bigint, event_id bigint, total_after double"
_STATE_SCHEMA = "total double, fired boolean"


def _purchases(events: DataFrame) -> DataFrame:
    return events.where(events.event_type == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )


def spend_alert_stream(events: DataFrame, threshold: float = 500.0) -> DataFrame:
    """Purchases stream -> one alert row per user crossing ``threshold``."""

    def update(
        key: Tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        total, fired = state.get if state.exists else (0.0, False)
        out = []
        pdf = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        for eid, val in zip(pdf["event_id"], pdf["value"]):
            total += float(val)
            if not fired and total >= threshold:
                fired = True
                out.append((int(key[0]), int(eid), round(total, 4)))
        state.update((total, fired))
        if out:
            yield pd.DataFrame(out, columns=["user_id", "event_id", "total_after"])

    return _purchases(events).groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=ALERT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def tws_available() -> bool:
    """transformWithStateInPandas needs google.protobuf for its state
    server; absent in some environments (including this container)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def spend_alert_stream_tws(events: DataFrame, threshold: float = 500.0) -> DataFrame:
    """Same semantics on the Spark 4 ``transformWithStateInPandas`` API
    (typed ValueState per key). Raises ImportError where protobuf is
    unavailable — check :func:`tws_available` first."""
    if not tws_available():
        raise ImportError(
            "transformWithStateInPandas requires google.protobuf; "
            "use spend_alert_stream instead"
        )
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class SpendThresholdProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self.total = handle.getValueState("total", "total double")
            self.fired = handle.getValueState("fired", "fired boolean")

        def handleInputRows(
            self, key: Any, rows: Iterator[pd.DataFrame], timer_values: Any
        ) -> Iterator[pd.DataFrame]:
            total = self.total.get()[0] if self.total.exists() else 0.0
            fired = self.fired.get()[0] if self.fired.exists() else False
            out = []
            pdf = pd.concat(list(rows)).sort_values(["ts", "event_id"])
            for eid, val in zip(pdf["event_id"], pdf["value"]):
                total += float(val)
                if not fired and total >= threshold:
                    fired = True
                    out.append((int(key[0]), int(eid), round(total, 4)))
            self.total.update((total,))
            self.fired.update((fired,))
            if out:
                yield pd.DataFrame(out, columns=["user_id", "event_id", "total_after"])

        def close(self) -> None:
            pass

    return _purchases(events).groupBy("user_id").transformWithStateInPandas(
        SpendThresholdProcessor(),
        outputStructType=ALERT_SCHEMA,
        outputMode="append",
        timeMode="none",
    )
