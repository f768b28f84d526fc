"""Custom stateful streaming operator via applyInPandasWithState.

Per-user running aggregates (event count, value total, last-seen
timestamp) maintained in explicit keyed state — the pattern for any
custom accumulator Structured Streaming's built-in aggs can't
express (decayed scores, top-k per key, fraud counters, ...).

State is one tuple per user_id; Arrow moves each micro-batch's rows
per key as pandas DataFrames. At scale the state store shards by
key across executors (RocksDB-backed on a real cluster).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("last_seen_us", LongType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("last_seen_us", LongType()),
    ]
)


def _update_user_state(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, total, last = state.get
    else:
        n, total, last = 0, 0.0, 0
    for pdf in pdfs:
        n += len(pdf)
        # cents-exact accumulation to keep parity with the batch
        # DECIMAL(28,2) running totals
        total = round(total + float(pdf["value"].sum()), 2)
        if len(pdf):
            # datetime64[ns] -> int64 is NANOseconds; // 1000 = micros.
            last = max(last, int(pdf["ts"].astype("datetime64[ns]").astype("int64").max()) // 1000)
    state.update((n, total, last))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [total],
            "last_seen_us": [last],
        }
    )


def user_running_totals(events: DataFrame) -> DataFrame:
    """Streaming per-user running totals with explicit keyed state.

    Output mode must be 'update'; each micro-batch emits the new
    running totals for users seen in that batch.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_state,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
