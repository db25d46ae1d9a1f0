"""Custom stateful streaming operators via applyInPandasWithState.

The built-in window/session operators (streaming/events.py) cover the
declarative cases; this module is the template for operator semantics Spark
lacks — per-key running state updated batch-by-batch with explicit timeout
handling.  Example implemented: per-user running aggregate with anomaly
flagging (count, sum, max seen so far; emits one row per user per
micro-batch)."""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = ("user_id bigint, n_events bigint, sum_value double, "
                 "max_value double, anomalous boolean")
STATE_SCHEMA = "n bigint, s double, mx double"


def _update_user_state(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState) -> Iterator[pd.DataFrame]:
    """Vectorized per-key update: fold each Arrow batch into (count, sum,
    max) running state; flag the user when a batch max exceeds 10× the
    running mean."""
    (user_id,) = key
    if state.hasTimedOut:
        state.remove()
        return
    n, s, mx = state.get if state.exists else (0, 0.0, float("-inf"))
    batch_max = float("-inf")
    for pdf in pdfs:
        vals = pdf["value"].astype(float)
        n += int(len(vals))
        s += float(vals.sum())
        batch_max = max(batch_max, float(vals.max()) if len(vals) else batch_max)
    mx = max(mx, batch_max)
    state.update((n, s, mx))
    state.setTimeoutDuration(24 * 3600 * 1000)
    mean = s / n if n else 0.0
    yield pd.DataFrame({
        "user_id": [user_id],
        "n_events": [n],
        "sum_value": [s],
        "max_value": [mx],
        "anomalous": [bool(n > 1 and batch_max > 10 * mean)],
    })


def running_user_stats(events: DataFrame) -> DataFrame:
    """Streaming per-user running stats with explicit state
    (applyInPandasWithState; processing-time timeout evicts idle keys so
    state stays bounded on unbounded key spaces)."""
    return (events
            .groupBy("user_id")
            .applyInPandasWithState(
                _update_user_state,
                outputStructType=OUTPUT_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.ProcessingTimeTimeout))
