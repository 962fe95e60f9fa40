"""Custom stateful streaming operator: conversation session tracking via
``applyInPandasWithState`` (the task-mandated pattern for stateful ops
Spark lacks natively).

State per conv_id: turn count, first/last event time, malformed count.
Each micro-batch updates the state and emits the current session summary
(update output mode); a processing-time timeout expires idle
conversations so state size is bounded by the number of ACTIVE
conversations, not all conversations ever seen — the property that makes
this viable at 10^12-turn scale.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_turns", T.LongType()),
        T.StructField("n_malformed", T.LongType()),
        T.StructField("first_ts", T.TimestampType()),
        T.StructField("last_ts", T.TimestampType()),
    ]
)

SESSION_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("n_turns", T.LongType()),
        T.StructField("n_malformed", T.LongType()),
        T.StructField("first_ts", T.TimestampType()),
        T.StructField("last_ts", T.TimestampType()),
        T.StructField("closed", T.BooleanType()),
    ]
)


def _update_session(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (conv_id,) = key
    if state.hasTimedOut:
        n_turns, n_malformed, first_ts, last_ts = state.get
        state.remove()
        yield pd.DataFrame(
            [[conv_id, n_turns, n_malformed, first_ts, last_ts, True]],
            columns=[f.name for f in SESSION_OUTPUT_SCHEMA.fields],
        )
        return
    n_turns, n_malformed, first_ts, last_ts = (
        state.get if state.exists else (0, 0, None, None)
    )
    for pdf in pdfs:
        n_turns += len(pdf)
        if "route" in pdf.columns:
            n_malformed += int((pdf["route"] == "malformed").sum())
        ts_min, ts_max = pdf["ts"].min(), pdf["ts"].max()
        first_ts = ts_min if first_ts is None else min(first_ts, ts_min)
        last_ts = ts_max if last_ts is None else max(last_ts, ts_max)
    state.update((n_turns, n_malformed, first_ts, last_ts))
    state.setTimeoutDuration(30_000)  # idle conversations expire
    yield pd.DataFrame(
        [[conv_id, n_turns, n_malformed, first_ts, last_ts, False]],
        columns=[f.name for f in SESSION_OUTPUT_SCHEMA.fields],
    )


def sessionize(stream: DataFrame) -> DataFrame:
    """Streaming session summaries keyed by conv_id (update mode)."""
    return stream.groupBy("conv_id").applyInPandasWithState(
        _update_session,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
