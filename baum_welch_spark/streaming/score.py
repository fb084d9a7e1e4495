"""Stateful streaming HMM scoring: an incremental forward pass per entity.

The custom stateful operator the reference could never express (its E-step
is batch-only): each user's observation stream updates a running scaled
forward vector alpha held in Spark state, emitting the cumulative
log-likelihood after every micro-batch. applyInPandasWithState keeps the
state columnar (alpha as array<double>), so state size is O(N) per key —
bounded regardless of stream length, the streaming analogue of Rabiner
scaling's numeric bound.

Batch-equivalence: driving the whole corpus through in one micro-batch must
produce exactly the per-sequence forward log-likelihood of
hmm.decode.score_sequences — asserted in tests/test_streaming_score.py.

Ordering contract: events are applied in (ts, event_id) order WITHIN each
micro-batch; across micro-batches the forward recursion cannot be rewound,
so an event arriving after a later-timestamped event has already been
applied is DROPPED (counted in ``n_late``) rather than silently applied out
of order, which would corrupt alpha for every subsequent update. Feed the
stream through a watermark + sort (or accept the drop count) when the
source can deliver late data.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, t_len bigint, loglik double, n_late bigint"
STATE_SCHEMA = (
    "alpha array<double>, loglik double, t bigint, "
    "last_ts_us bigint, last_eid bigint, n_late bigint"
)


def _ts_us(v) -> int:
    """Event time as comparable microseconds (timestamps in the real stream,
    plain ints in unit fixtures)."""
    if isinstance(v, pd.Timestamp):
        return v.value // 1000
    return int(v)


def hmm_stream_scorer(model, symbol_to_id: dict[str, int]):
    """Build the applyInPandasWithState function: incremental scaled forward
    updates from (ts-ordered) event batches."""
    pi, A, B = model.pi, model.A, model.B

    def update(
        key: Any,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            alpha_list, loglik, t, last_ts_us, last_eid, n_late = state.get
            # alpha_list is None when every prior event was an unknown
            # symbol — state was persisted before the first real update
            alpha = np.asarray(alpha_list, dtype=np.float64) if alpha_list is not None else None
        else:
            alpha, loglik, t, last_ts_us, last_eid, n_late = None, 0.0, 0, None, None, 0
        rows = pd.concat(list(pdfs))
        rows = rows.sort_values(["ts", "event_id"])
        for ts_v, eid, et in zip(rows["ts"], rows["event_id"], rows["event_type"]):
            pos = (_ts_us(ts_v), int(eid))
            if last_ts_us is not None and pos <= (last_ts_us, last_eid):
                # arrived after a later event was already applied: the
                # forward recursion cannot rewind — drop and count
                n_late += 1
                continue
            last_ts_us, last_eid = pos
            o = symbol_to_id.get(et)
            if o is None:
                continue
            if alpha is None:
                a = pi * B[:, o]
            else:
                a = (alpha @ A) * B[:, o]
            scale = a.sum()
            alpha = a / scale
            loglik += float(np.log(scale))
            t += 1
        state.update(
            (alpha.tolist() if alpha is not None else None, loglik, t, last_ts_us, last_eid, n_late)
        )
        yield pd.DataFrame(
            {"user_id": [key[0]], "t_len": [t], "loglik": [loglik], "n_late": [n_late]}
        )

    return update


def score_stream(events: DataFrame, model, symbol_to_id: dict[str, int]) -> DataFrame:
    """events stream -> per-user running (t_len, loglik) under ``model``.

    Scale: state shuffles once on user_id and stays partitioned; each key
    holds N doubles. No watermark needed (state never grows with T).
    """
    return (
        events.select("user_id", "event_id", "ts", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            hmm_stream_scorer(model, symbol_to_id),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
