"""Custom stateful streaming operators (applyInPandasWithState).

Spark's built-in windows cover time-bucketed aggregation; these cover
the cases that need arbitrary per-key state machines — the reference's
pipeline-logger keeps exactly this kind of per-file processing state
in Firestore (file_registry / processing_locks). Here the state lives
in Spark's checkpointed state store instead of an external KV.

running_user_stats: per-user lifetime counters (event count, value
sum, last-seen) updated per micro-batch and emitted on every update —
the streaming analogue of gold_customer_metrics. State is bounded by a
processing-time timeout: users idle past ``idle_timeout_ms`` are
evicted after emitting a final record (at 100 TB/day the state store
would otherwise grow without bound).

Arrow-batched: each grouped key's rows arrive as pandas DataFrames;
no row-at-a-time pickling.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator
from typing import TYPE_CHECKING, Any

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

if TYPE_CHECKING:
    import pandas as pd

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("last_seen", TimestampType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("last_seen", TimestampType()),
        StructField("status", StringType()),
    ]
)


def _update_user(
    key: tuple[Any, ...],
    batches: Iterable["pd.DataFrame"],
    state: GroupState,
) -> Iterator["pd.DataFrame"]:
    import pandas as pd

    (user_id,) = key
    if state.hasTimedOut:
        n, total, last = state.get
        state.remove()
        yield pd.DataFrame(
            [[user_id, n, total, last, "evicted"]],
            columns=[f.name for f in OUTPUT_SCHEMA.fields],
        )
        return

    n, total, last = state.get if state.exists else (0, 0.0, None)
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].fillna(0.0).sum())
        batch_max = pdf["ts"].max()
        last = batch_max if last is None else max(last, batch_max)
    state.update((n, round(total, 2), last))
    state.setTimeoutDuration(3_600_000)  # evict after 1h idle
    yield pd.DataFrame(
        [[user_id, n, round(total, 2), last, "active"]],
        columns=[f.name for f in OUTPUT_SCHEMA.fields],
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """Per-user running counters over a stream of events(ts, user_id,
    value). Works on streaming frames (update mode); the grouping is
    one shuffle on user_id, state partitioned the same way."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
