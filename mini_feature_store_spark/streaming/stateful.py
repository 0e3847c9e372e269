"""Custom stateful streaming: running per-user feature state.

``applyInPandasWithState`` is the escape hatch for stateful semantics the
built-in streaming aggregations can't express (per SURVEY.md §2.11 the
reference has no streaming at all — its "freshness" is a re-run batch sync,
``README.md:67`` — so this whole module is a capability add). Here it keeps
a per-user running feature vector (event count, value sum, last-seen
timestamp) across micro-batches and emits the updated snapshot every time
the user appears — the continuously-fresh online store the reference
approximates with scheduled re-syncs.

Scale shape: state is partitioned by the grouping key across executors and
checkpointed incrementally (RocksDB state store in production configs);
a watermark + ``GroupStateTimeout`` bounds state growth by evicting idle
users. Per micro-batch work is proportional to the batch's active keys,
never to the total user population.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: (count, value_sum, last_ts_epoch_us) — the running state tuple.
_STATE_SCHEMA = "count LONG, value_sum DOUBLE, last_ts LONG"
_OUTPUT_SCHEMA = (
    "user_id STRING, event_count BIGINT, value_sum DOUBLE, last_ts TIMESTAMP"
)


def _update_user_state(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    if state.hasTimedOut:
        # idle user evicted: emit nothing, drop state (bounds state size)
        state.remove()
        return
    count, value_sum, last_ts = (
        state.get if state.exists else (0, 0.0, 0)
    )
    for pdf in pdfs:
        count += len(pdf)
        value_sum += float(pdf["value"].fillna(0.0).sum())
        batch_max = pdf["ts"].max()
        if pd.notna(batch_max):
            last_ts = max(last_ts, int(batch_max.value // 1000))
    state.update((count, value_sum, last_ts))
    # one hour of event-time inactivity evicts the state entry
    state.setTimeoutTimestamp(last_ts // 1000 + 3600 * 1000)
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "event_count": [count],
            "value_sum": [round(value_sum, 4)],
            "last_ts": [pd.Timestamp(last_ts, unit="us")],
        }
    )


def running_user_features(
    events: DataFrame,
    watermark: str = "1 hour",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Continuously-updated per-user feature snapshots from an event stream.

    Input stream schema must include (user_id, ts timestamp, value double).
    Emits one updated row per (user, micro-batch-with-activity); downstream
    ``foreachBatch`` + KV upsert (``stream_online_sync``) completes the
    always-fresh online path.
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(user_col)
        .applyInPandasWithState(
            _update_user_state,
            outputStructType=_OUTPUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
