"""Stateful streaming sessionization (applyInPandasWithState).

The batch engine sessionizes with lag + cumulative sum
(__spark_entry__.q_events_sessions); this is the INCREMENTAL formulation
for unbounded streams: per-user state carries the open tail session, each
micro-batch emits the sessions it closes (a >gap_sec silence between
consecutive events), and the open session stays in state until a later
batch closes it.  This is the standard custom-stateful-operator pattern —
``groupBy(user).applyInPandasWithState`` with an explicit state schema —
rather than ``F.session_window``, because the reference-shaped output
(dense per-user session ordinals, first_event) needs per-group sequencing
that the built-in session window does not expose.

Semantics match the batch twin exactly for every CLOSED session:
tests/test_streaming_sessions.py replays the same events through both
paths and asserts the emitted rows equal the batch result minus each
user's final (still-open) session.

Scale posture: state is O(active users) × four longs, hash-distributed by
user_id; each micro-batch shuffles only its own events (plus the compact
state), so throughput is bounded by the same groupBy-shuffle cost as the
batch path.  ``idle_close=True`` adds a watermark + EventTimeTimeout that
force-closes idle sessions (bounded state — the production mode); the
NoTimeout default keeps emitted rows a deterministic function of the
input (no watermark dependence in tests).
"""

from __future__ import annotations

from typing import Any, Iterable

import pandas as pd

GAP_SEC_DEFAULT = 1800

OUTPUT_SCHEMA = (
    "user_id long, session_id long, n_events long, first_event long"
)
# open-tail session: ordinal, last event time (µs), count, first event id,
# plus how many sessions this user has already closed (for dense ordinals)
STATE_SCHEMA = (
    "session_id long, last_ts long, n_events long, first_event long"
)


def _session_rows(
    key: tuple,
    pdf_iter: Iterable[pd.DataFrame],
    state: Any,
    gap_us: int,
    idle_close: bool = False,
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        session_id, last_ts, n_events, first_event = state.get
    else:
        session_id, last_ts, n_events, first_event = 0, None, 0, None

    if idle_close and state.hasTimedOut:
        # Watermark passed last_ts + gap with no new events: the open tail
        # session can never be extended (later events would be late past
        # the watermark) — force-close and clear state.
        state.remove()
        if n_events > 0:
            yield pd.DataFrame(
                [(user_id, session_id, n_events, first_event)],
                columns=["user_id", "session_id", "n_events", "first_event"],
            )
        return

    closed: list[tuple[int, int, int, int]] = []
    for pdf in pdf_iter:
        pdf = pdf.sort_values(["ts", "event_id"])
        # Arrow hands timestamps to pandas as datetime64[ns]; normalize to
        # µs so the gap comparison matches the batch twin's unix_micros.
        ts_col = pdf["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        for ts_us, event_id in zip(ts_col, pdf["event_id"]):
            if last_ts is not None and ts_us - last_ts > gap_us:
                closed.append((user_id, session_id, n_events, first_event))
                session_id += 1
                n_events, first_event = 0, None
            # first_event is MIN(event_id) over the session (the batch
            # twin's and oracle's definition) — not the chronologically
            # first event's id, which only coincides when ids are monotone
            # in event time.
            if n_events == 0:
                first_event = int(event_id)
            else:
                first_event = min(first_event, int(event_id))
            n_events += 1
            last_ts = int(ts_us)

    state.update((session_id, last_ts, n_events, first_event))
    if idle_close and last_ts is not None:
        # Fire when the event-time watermark passes the session gap after
        # the last event (setTimeoutTimestamp takes epoch MILLIS).
        state.setTimeoutTimestamp(last_ts // 1000 + gap_us // 1000)
    if closed:
        yield pd.DataFrame(
            closed,
            columns=["user_id", "session_id", "n_events", "first_event"],
        )


def sessionize_stream(
    events,
    gap_sec: int = GAP_SEC_DEFAULT,
    checkpoint_dir=None,
    idle_close: bool = False,
    watermark: str = "10 minutes",
):
    """events stream (event_id, ts, user_id, ...) → closed-session stream.

    Returns a streaming DataFrame in append mode; pair with any sink.
    ``session_id`` is the dense per-user ordinal (0-based in event-time
    order), matching the batch formulation's cumulative-sum ids up to the
    0/1 base.

    ``idle_close=False`` (NoTimeout): a user's open tail session stays in
    state until a later event closes it — emitted rows are a deterministic
    function of the input (no watermark dependence), but an idle user pins
    four longs of state forever.  ``idle_close=True`` is the production
    hygiene mode: a ``watermark`` on ``ts`` + EventTimeTimeout force-closes
    (and emits) any session idle past ``gap_sec`` once the watermark passes,
    so state is bounded by the number of RECENTLY-active users.  Both modes
    emit identical rows for every session closed by a successor event;
    idle_close additionally emits expired tails
    (tests/test_streaming_sessions.py::test_idle_close_expires_tail_sessions).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_us = gap_sec * 1_000_000

    def fn(key, pdfs, state):
        yield from _session_rows(key, pdfs, state, gap_us, idle_close)

    if idle_close:
        events = events.withColumn(
            "ts", F.col("ts").cast("timestamp")
        ).withWatermark("ts", watermark)
        timeout = GroupStateTimeout.EventTimeTimeout
    else:
        timeout = GroupStateTimeout.NoTimeout

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=timeout,
        )
    )
