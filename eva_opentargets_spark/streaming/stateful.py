"""Custom stateful streaming operator: gap-based sessionization over an
event stream via applyInPandasWithState.

This is the streaming twin of operators/events.sessionize (which the DuckDB
oracle verifies in batch): per user, events accumulate into a session while
gaps stay under `gap_seconds`; a longer gap CLOSES the session, which is
emitted downstream (append semantics), while the still-open tail session
lives in the group state and survives micro-batch boundaries AND query
restarts (state is checkpointed). This is the pattern the engine uses for
any custom stateful operator Spark lacks natively — the state struct is
explicit, bounded (one open session per key), and typed.

Scale shape: state is keyed by user_id (hash-partitioned by the engine);
per-key state is O(1) (five scalars), so total state is O(active users),
not O(events).

Two timeout modes:
  * NoTimeout (sessionize_stream) — deterministic availableNow drains;
    idle open sessions stay in state until more events arrive.
  * EventTimeTimeout (sessionize_stream_event_time) — the production
    mode: a watermark bounds lateness and each key arms a timeout at
    last_event + gap, so idle open sessions are FLUSHED by the engine
    once the watermark passes the gap — state size stays O(concurrently
    active users) even when users disappear forever.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)

SESSION_SCHEMA = (
    "user_id long, session_start_epoch long, n_events long, "
    "start_epoch long, end_epoch long"
)

# (open-session accumulator) start_epoch, last_epoch, n_events
STATE_SCHEMA = "start_epoch long, last_epoch long, n_events long"


def make_sessionizer(gap_seconds: int = 1800, event_time_timeout: bool = False):
    """Returns the applyInPandasWithState function: merges each batch's
    (sorted) events into the open-session accumulator, emits every session
    CLOSED by a gap, keeps the open tail in state. With
    `event_time_timeout`, each key arms a timeout at last_event + gap; when
    the watermark passes it, the engine re-invokes this function with
    state.hasTimedOut and the open session is flushed downstream."""

    COLS = ["user_id", "session_start_epoch", "n_events", "start_epoch", "end_epoch"]

    def sessionize_group(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if event_time_timeout and state.hasTimedOut:
            # watermark passed last_event + gap: the open session can never
            # be extended by on-time data -> flush it and drop the state
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame([(user_id, start, n, start, last)], columns=COLS)
            return
        if state.exists:
            start, last, n = state.get
        else:
            start, last, n = None, None, 0
        closed: list[tuple] = []
        events = pd.concat(list(pdfs), ignore_index=True)
        # stable (ts, event_id) order — same composite ordering as the
        # batch operator, so equal timestamps resolve identically
        events = events.sort_values(["ts", "event_id"])
        # `epoch` is computed JVM-side (unix_timestamp, session-timezone
        # aware) before the state function: interpreting the Arrow-delivered
        # naive timestamp here would silently assume UTC and shift every
        # emitted epoch whenever spark.sql.session.timeZone isn't UTC
        for epoch in events["epoch"]:
            epoch = int(epoch)
            if last is not None and epoch - last > gap_seconds:
                closed.append((user_id, start, n, start, last))
                start, n = epoch, 0
            if start is None:
                start = epoch
            last = epoch
            n += 1
        state.update((start, last, n))
        if event_time_timeout and last is not None:
            state.setTimeoutTimestamp((last + gap_seconds) * 1000)
        if closed:
            yield pd.DataFrame(closed, columns=COLS)

    return sessionize_group


def sessionize_stream(spark, input_path: str, gap_seconds: int = 1800):
    """readStream(parquet events) -> per-user stateful sessionization.
    Returns the unstarted streaming DataFrame of CLOSED sessions."""
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .parquet(input_path)
        .withColumn("epoch", F.unix_timestamp("ts"))
    )
    return stream.groupBy("user_id").applyInPandasWithState(
        make_sessionizer(gap_seconds),
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def sessionize_stream_event_time(
    spark, input_path: str, gap_seconds: int = 1800, watermark: str = "30 minutes"
):
    """Production-mode sessionization: watermark-bounded lateness +
    event-time timeouts flushing idle open sessions (the state-size
    guarantee a 10^12-event stream needs — keys that go quiet forever are
    evicted once the watermark passes their gap, instead of accumulating).
    Returns the unstarted streaming DataFrame of closed AND flushed
    sessions."""
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .parquet(input_path)
        .withWatermark("ts", watermark)
        .withColumn("epoch", F.unix_timestamp("ts"))
    )
    return stream.groupBy("user_id").applyInPandasWithState(
        make_sessionizer(gap_seconds, event_time_timeout=True),
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
