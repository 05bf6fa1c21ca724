"""Custom stateful streaming operator via ``applyInPandasWithState``.

The built-in windowed aggregations (events_stream.py) cover the
reference-shaped rollups; this module is the engine's arbitrary-state
surface — the Spark-native replacement for hand-rolled accumulator
loops (the reference's only "state" is a driver-local dict,
final_kpis.py:41-46).

Scale notes: state lives in the state store partitioned by the group
key, one shuffle per micro-batch; per-group state here is O(1) (three
scalars), so state size is O(distinct users), never O(stream length).
The same entry point runs in batch mode as a plain aggregation —
batch/stream parity is pinned in tests/test_streaming.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double, last_ts timestamp"
STATE_SCHEMA = "n long, total double, last_ts timestamp"


def user_running_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, value-sum, max-event-time).

    Streaming: ``applyInPandasWithState`` — the running triple is the
    group state; every micro-batch emits the group's updated totals
    (output mode ``update``), so downstream sinks always have the
    latest per-user row.  Batch: the equivalent one-shot aggregation.
    """
    if not events.isStreaming:
        return events.groupBy("user_id").agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("total_value"),
            F.max("ts").alias("last_ts"),
        )

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, total, last_ts = state.get
        else:
            n, total, last_ts = 0, 0.0, None
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            batch_max = pdf["ts"].max()
            if last_ts is None or batch_max > last_ts:
                last_ts = batch_max
        state.update((n, total, last_ts))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [total],
                "last_ts": [last_ts],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
