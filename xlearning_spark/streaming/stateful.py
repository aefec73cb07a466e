"""Custom stateful streaming operator (SURVEY.md §2.10 T3, §4.2 item 2):
per-key liveness/timeout tracking with applyInPandasWithState.

This is the live form of the reference's TimeoutMonitor — a thread
that marks a container FAILED when ``now > lastHeartbeat + timeout``
(reference: ApplicationContainerListener.java:988-1023, 5-minute
default from HboxConfiguration.java:279-281). The batch/oracle twins
are q34/q35; the session_window form is streaming/__init__.py. This
variant keeps explicit per-key state (last-seen timestamp, event
count) and emits a terminal row when the watermark passes a key's
timeout — semantics the built-in windows can't express (the emitted
row carries accumulated state, not just window bounds).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: Output: one row per expired key (the "container FAILED" record).
TIMEOUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("last_seen", TimestampType()),
        StructField("n_events", LongType()),
        StructField("status", StringType()),
    ]
)

_STATE_SCHEMA = "last_seen_us long, n_events long"


def monitor_timeouts(
    events: DataFrame,
    gap_seconds: int = 1800,
    watermark: str = "2 hours",
) -> DataFrame:
    """Keyed liveness monitor: emits (key, last_seen, n_events, 'TIMED_OUT')
    once a key has been silent for ``gap_seconds`` of event time.

    State per key is two longs — bounded like the reference's per-container
    map entries; eviction is driven by the event-time timeout so state
    can't grow with key churn.
    """

    def track(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            last_us, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "last_seen": [pd.Timestamp(last_us, unit="us")],
                    "n_events": [n],
                    "status": ["TIMED_OUT"],
                }
            )
            return
        last_us, n = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            if len(pdf):
                batch_max = pdf["ts"].max()
                last_us = max(last_us, int(batch_max.value // 1000))
                n += len(pdf)
        state.update((last_us, n))
        # Event-time timeout: fires when the watermark passes
        # last_seen + gap — exactly the reference's lastHeartbeat+timeout.
        state.setTimeoutTimestamp(last_us // 1000 + gap_seconds * 1000)
        yield pd.DataFrame(
            {
                "user_id": pd.Series([], dtype="int64"),
                "last_seen": pd.Series([], dtype="datetime64[us]"),
                "n_events": pd.Series([], dtype="int64"),
                "status": pd.Series([], dtype="object"),
            }
        )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            track,
            outputStructType=TIMEOUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
