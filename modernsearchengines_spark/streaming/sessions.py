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
batch path.  A production deployment adds a watermark + EventTimeTimeout
to force-close idle sessions; kept NoTimeout here so emitted rows are a
deterministic function of the input (no wall-clock dependence in tests).
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
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        session_id, last_ts, n_events, first_event = state.get
    else:
        session_id, last_ts, n_events, first_event = 0, None, 0, None

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
            if n_events == 0:
                first_event = int(event_id)
            n_events += 1
            last_ts = int(ts_us)

    state.update((session_id, last_ts, n_events, first_event))
    if closed:
        yield pd.DataFrame(
            closed,
            columns=["user_id", "session_id", "n_events", "first_event"],
        )


def sessionize_stream(events, gap_sec: int = GAP_SEC_DEFAULT, checkpoint_dir=None):
    """events stream (event_id, ts, user_id, ...) → closed-session stream.

    Returns a streaming DataFrame in append mode; pair with any sink.
    ``session_id`` is the dense per-user ordinal (0-based in event-time
    order), matching the batch formulation's cumulative-sum ids up to the
    0/1 base.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_us = gap_sec * 1_000_000

    def fn(key, pdfs, state):
        yield from _session_rows(key, pdfs, state, gap_us)

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
