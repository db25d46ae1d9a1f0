"""Custom stateful streaming operators via applyInPandasWithState.

The built-in window/session operators (streaming/events.py) cover the
declarative cases; this module holds operator semantics Spark lacks —
per-key running state updated batch-by-batch with explicit timeout
handling:

- :func:`running_user_stats` — per-user running aggregate with anomaly
  flagging (the plumbing template);
- :func:`funnel_stream` / :func:`cohort_stream` — streaming twins of
  ``operators.temporal.funnel`` / ``cohort_retention`` (VERDICT r4 #5).
  Both emit the user's CURRENT state each micro-batch (update-stream
  shape); on a drained stream the final row per user reproduces the batch
  operator's per-user result exactly, including cross-batch out-of-order
  arrival, because the state buffers the (bounded) per-step/bucket time
  sets rather than a running scalar that late data could corrupt."""

from __future__ import annotations

import json
from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
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


# --------------------------------------------------------------------------
# Streaming funnel / cohort twins (operators.temporal parity)
# --------------------------------------------------------------------------

FUNNEL_OUT_SCHEMA = ("user_id bigint, n_events_seen bigint, "
                     "reach_times array<bigint>")
COHORT_OUT_SCHEMA = ("user_id bigint, cohort_bucket bigint, "
                     "offsets array<bigint>, n_buckets bigint")
_JSON_STATE = "js string"


def _funnel_chain(bufs: list[list[int]],
                  within: "int | None") -> list[int]:
    """The batch funnel recurrence over buffered per-step times:
    r_1 = min(times_1); r_k = min{t in times_k : t >= r_(k-1)
    [and t <= r_(k-1) + within]} — identical to operators.temporal.funnel
    (each r_k is the earliest completion AFTER the previous step).
    Returns the COMPLETED PREFIX only (the chain stalls monotonically, so
    the stalled suffix carries no information): len(result) = number of
    funnel steps the user has completed."""
    reach: list[int] = []
    prev = None
    for i, times in enumerate(bufs):
        elig = [t for t in times
                if i == 0 or (t >= prev
                              and (within is None or t <= prev + within))]
        if not elig:
            break
        prev = min(elig)
        reach.append(prev)
    return reach


def _timeout_conf(timeout_mode: str):
    if timeout_mode == "processing":
        return GroupStateTimeout.ProcessingTimeTimeout
    if timeout_mode == "event":
        return GroupStateTimeout.EventTimeTimeout
    raise ValueError(
        f"timeout_mode must be 'processing' or 'event', got {timeout_mode!r}")


def _arm_timeout(state: GroupState, timeout_mode: str,
                 state_ttl_ms: int, max_event_ms: int = 0) -> None:
    """Arm state eviction.  Processing mode: wall-clock TTL since last
    touch.  Event mode: the state dies when the WATERMARK passes
    max(user's last observed event time, current watermark) + ttl — a
    declarative event-time bound (late data beyond the watermark is
    already dropped by Spark before the operator, and state lifetime is
    measured in stream time, not wall time — the production late-data
    story, VERDICT r5 #4).

    The max() matters in the FIRST micro-batch, where the watermark is
    still 0 (it only advances between batches): arming off the watermark
    alone would give a ~1970-epoch timeout and evict the key as soon as
    the batch-2 watermark advanced — far earlier than the documented
    'state dies state_ttl_ms of event time after the user's last
    update'.  ``max_event_ms`` is the running per-user max event time
    (tracked in state), so eviction is tied to the user's last update."""
    if timeout_mode == "processing":
        state.setTimeoutDuration(state_ttl_ms)
    else:
        base = max(int(max_event_ms), state.getCurrentWatermarkMs())
        state.setTimeoutTimestamp(base + state_ttl_ms)


def funnel_stream(events: DataFrame, steps: list[str],
                  user_col: str = "user_id", type_col: str = "event_type",
                  ts_col: str = "ts",
                  within_micros: "int | None" = None,
                  max_buffer: int = 128,
                  timeout_mode: str = "processing",
                  watermark_delay: str = "1 hour",
                  state_ttl_ms: int = 24 * 3600 * 1000) -> DataFrame:
    """Streaming conversion funnel: per user, emit the current
    first-touch step-completion chain (epoch-micros of the completed
    step prefix; the list length = steps completed) after every
    micro-batch that touches the user.  Counting final rows with
    ``len(reach_times) > k`` = batch ``funnel``'s n_users for step k+1.

    State per user: the ``max_buffer`` SMALLEST event times per step.
    The chain thresholds r_k only ever DECREASE as more events arrive,
    so keeping the smallest times is exactly sufficient — state is lossy
    only for a user with more than ``max_buffer`` step-k events earlier
    than the final r_(k-1), and bounded at steps × max_buffer longs per
    user regardless of stream length.  Late events that lower an earlier
    step's time correctly re-derive the downstream chain from the
    buffers (a running-scalar implementation could not).  Keyed on the
    user — one shuffle per micro-batch, the same key the batch operator
    aggregates on.

    ``timeout_mode='event'``: state eviction is driven by the WATERMARK
    (``withWatermark(ts_col, watermark_delay)`` + EventTimeTimeout) —
    events later than the watermark are dropped declaratively before the
    operator, and per-user state dies ``state_ttl_ms`` of EVENT time
    after the user's last update, independent of wall-clock replay
    speed.  Requires ``ts_col`` to be TimestampType (a streaming
    watermark constraint).  The default 'processing' mode keeps the
    wall-clock TTL."""
    if not steps:
        raise ValueError("steps must be non-empty")
    from ..operators.temporal import epoch_micros
    n_steps = len(steps)
    step_idx = {s: i for i, s in enumerate(steps)}
    tconf = _timeout_conf(timeout_mode)

    def update(key: Tuple[Any, ...], pdfs: Iterable[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            state.remove()
            return
        st = (json.loads(state.get[0]) if state.exists
              else {"n": 0, "mx": 0, "bufs": [[] for _ in range(n_steps)]})
        for pdf in pdfs:
            st["n"] += int(len(pdf))
            for s, t in zip(pdf["t"], pdf["e"]):
                i = step_idx.get(s)
                # running max over ALL events (not just funnel steps):
                # eviction is tied to the user's last update (micros->ms)
                st["mx"] = max(st.get("mx", 0), int(t) // 1000)
                if i is not None:
                    st["bufs"][i].append(int(t))
        st["bufs"] = [sorted(b)[:max_buffer] for b in st["bufs"]]
        state.update((json.dumps(st),))
        _arm_timeout(state, timeout_mode, state_ttl_ms, st.get("mx", 0))
        yield pd.DataFrame({
            "user_id": [user_id],
            "n_events_seen": [st["n"]],
            "reach_times": [_funnel_chain(st["bufs"], within_micros)],
        })

    src = events
    cols = [F.col(user_col).alias("user_id"),
            F.col(type_col).alias("t"),
            epoch_micros(events, ts_col).alias("e")]
    if timeout_mode == "event":
        src = events.withWatermark(ts_col, watermark_delay)
        # the event-time column must survive the projection for the
        # watermark to reach the stateful operator
        cols.append(F.col(ts_col).alias("_wm_ts"))
    prep = src.select(*cols)
    return (prep.groupBy("user_id")
            .applyInPandasWithState(
                update, outputStructType=FUNNEL_OUT_SCHEMA,
                stateStructType=_JSON_STATE, outputMode="append",
                timeoutConf=tconf))


def cohort_stream(events: DataFrame, user_col: str = "user_id",
                  ts_col: str = "ts", bucket_seconds: int = 86400,
                  max_buckets: int = 512,
                  timeout_mode: str = "processing",
                  watermark_delay: str = "1 hour",
                  state_ttl_ms: int = 24 * 3600 * 1000) -> DataFrame:
    """Streaming cohort-retention state: per user, emit (cohort bucket =
    min active bucket so far, sorted offsets of all active buckets) after
    every micro-batch that touches the user.  Exploding the final rows to
    (cohort_bucket, offset) and counting users reproduces batch
    ``cohort_retention`` exactly.

    State per user: the ``max_buckets`` smallest distinct activity
    buckets (integer epoch-bucket ids — all-integer arithmetic, the
    batch twin's engine-exact convention).  The cohort assignment is a
    running min, so late events re-base the cohort and the emitted
    offsets shift accordingly — consumers of the update stream keep the
    user's latest row.  Bounded state: max_buckets longs per user (a
    user active in more distinct buckets than that drops the largest —
    document/raise max_buckets for multi-year horizons).

    ``timeout_mode='event'``: watermark-driven eviction, same contract
    as :func:`funnel_stream` (requires TimestampType ``ts_col``)."""
    from ..operators.windows import epoch_seconds
    tconf = _timeout_conf(timeout_mode)

    def update(key: Tuple[Any, ...], pdfs: Iterable[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            state.remove()
            return
        st = (json.loads(state.get[0]) if state.exists
              else {"k": [], "mx": 0})
        if isinstance(st, list):          # pre-r7 state layout (bare list)
            st = {"k": st, "mx": 0}
        buckets = set(st["k"])
        mx = int(st.get("mx", 0))
        for pdf in pdfs:
            buckets.update(int(b) for b in pdf["b"])
            if "_wm_ts" in pdf.columns and len(pdf):
                # event mode: running max event time (ms) so eviction is
                # tied to the user's last update, not the batch watermark
                mx = max(mx, int(pd.Timestamp(pdf["_wm_ts"].max()).value
                                 // 1_000_000))
        kept = sorted(buckets)[:max_buckets]
        state.update((json.dumps({"k": kept, "mx": mx}),))
        _arm_timeout(state, timeout_mode, state_ttl_ms, mx)
        cohort = kept[0]
        yield pd.DataFrame({
            "user_id": [user_id],
            "cohort_bucket": [cohort],
            "offsets": [[b - cohort for b in kept]],
            "n_buckets": [len(kept)],
        })

    src = events
    es = epoch_seconds(events, ts_col)
    b = ((es - es % bucket_seconds) / bucket_seconds).cast("long")
    cols = [F.col(user_col).alias("user_id"), b.alias("b")]
    if timeout_mode == "event":
        src = events.withWatermark(ts_col, watermark_delay)
        cols.append(F.col(ts_col).alias("_wm_ts"))
    prep = src.select(*cols)
    return (prep.groupBy("user_id")
            .applyInPandasWithState(
                update, outputStructType=COHORT_OUT_SCHEMA,
                stateStructType=_JSON_STATE, outputMode="append",
                timeoutConf=tconf))
