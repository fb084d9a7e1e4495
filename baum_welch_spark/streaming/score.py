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
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, t_len bigint, loglik double"
STATE_SCHEMA = "alpha array<double>, loglik double, t bigint"


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
            alpha_list, loglik, t = state.get
            # alpha_list is None when every prior event was an unknown
            # symbol — state was persisted before the first real update
            alpha = np.asarray(alpha_list, dtype=np.float64) if alpha_list is not None else None
        else:
            alpha, loglik, t = None, 0.0, 0
        rows = pd.concat(list(pdfs))
        rows = rows.sort_values(["ts", "event_id"])
        for et in rows["event_type"]:
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
        state.update((alpha.tolist() if alpha is not None else None, loglik, t))
        yield pd.DataFrame({"user_id": [key[0]], "t_len": [t], "loglik": [loglik]})

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
