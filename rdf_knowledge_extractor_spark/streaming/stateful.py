"""Custom stateful streaming operator: event-time sessionization via
`applyInPandasWithState`.

The batch engine sessionizes with a lag/window pass
(`__spark_entry__.q_events_sessions`); on an unbounded stream the same
semantics need per-key STATE: a session stays open across micro-batches
until the event-time watermark passes `gap` seconds beyond its last
event, then exactly one session row is emitted (exactly-once under
checkpointing).

Scale shape: state is partitioned by `user_id` (the shuffle key), one
small dict per live key, timeout-driven eviction — the standard
Structured Streaming pattern for custom session windows beyond what
`session_window` covers (here: custom payload aggregation per
session).
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

# state: (start_epoch_us, end_epoch_us, n_events, total_value)
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("end_us", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)

_US = 1_000_000


def _utc_naive(epoch_sec: float) -> "dt.datetime":
    """tz-aware UTC conversion, returned naive for Arrow transfer.

    `utcfromtimestamp` is deprecated (3.12+); the session timezone is
    enforced UTC by `streaming_sessions_stateful`, so naive-epoch math
    on the pandas int64 view is exact (ADVICE r2)."""
    return dt.datetime.fromtimestamp(epoch_sec, tz=dt.timezone.utc).replace(
        tzinfo=None
    )


def _session_func(gap_seconds: int):
    gap_us = gap_seconds * _US

    def fn(key, pdfs, state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            start_us, end_us, n, total = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [_utc_naive(start_us / _US)],
                    "session_end": [_utc_naive(end_us / _US)],
                    "n_events": [n],
                    "total_value": [total],
                }
            )
            return

        rows = pd.concat(list(pdfs), ignore_index=True).sort_values("ts")
        ts_us = (rows["ts"].astype("int64") // 1000).tolist()  # ns → µs
        vals = rows["value"].fillna(0.0).tolist()
        if state.exists:
            start_us, end_us, n, total = state.get
        else:
            start_us, end_us, n, total = 0, 0, 0, 0.0
        closed: list[tuple] = []
        # events sorted within the batch; watermark bounds cross-batch
        # disorder — a session closes when the gap is exceeded inline
        for t, v in zip(ts_us, vals):
            t = int(t)
            if n > 0 and t - end_us > gap_us:
                closed.append((start_us, end_us, n, total))
                n, total = 0, 0.0
            if n == 0:
                start_us = t
            end_us = max(end_us, t) if n > 0 else t
            n += 1
            total += float(v)
        state.update((start_us, end_us, n, total))
        # event-time timeout: fire when the watermark passes last+gap
        # (setTimeoutTimestamp takes epoch MILLIseconds)
        state.setTimeoutTimestamp(end_us // 1000 + gap_seconds * 1000)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [
                        _utc_naive(s / _US) for s, _, _, _ in closed
                    ],
                    "session_end": [
                        _utc_naive(e / _US) for _, e, _, _ in closed
                    ],
                    "n_events": [c for _, _, c, _ in closed],
                    "total_value": [tv for _, _, _, tv in closed],
                }
            )

    return fn


def streaming_sessions_stateful(
    events_stream: DataFrame, gap_seconds: int = 1800, watermark: str = "1 hour"
) -> DataFrame:
    """events stream (ts, user_id, value, …) → closed-session rows.

    Sessions close when event-time watermark passes `gap_seconds`
    beyond the session's last event (EventTimeTimeout), or inline when
    a later event in the same key exceeds the gap.

    Requires a UTC session timezone: the state function's epoch math
    reads tz-naive pandas timestamps as UTC; under any other
    `spark.sql.session.timeZone` the timeout timestamp would shift by
    the UTC offset (sessions closing hours early/late)."""
    tz = events_stream.sparkSession.conf.get("spark.sql.session.timeZone")
    if tz not in ("UTC", "Etc/UTC", "GMT", "Z", "+00:00"):
        raise ValueError(
            "streaming_sessions_stateful requires spark.sql.session.timeZone"
            f"=UTC (got {tz!r}): stateful epoch math assumes UTC-naive "
            "timestamps"
        )
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_func(gap_seconds),
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
